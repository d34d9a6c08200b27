"""Unit tests for the session-17 graph operators: K-core peel and
multi-source BFS hop distance over the link fixture. Oracle value-parity
is covered by the driver gate / check_oracles; these pin (a) the numeric
semantics against independent python ground truth and (b) the
small-task / distributed route equivalence, plus the unroll-depth
invariant the SQL oracles rely on (peel depth / BFS eccentricity must
stay under the unrolled round count).
"""

import collections

import duckdb
import pandas as pd

from adaptive_pdf_extractor_ray.pipelines import queries as q
from adaptive_pdf_extractor_ray.stages import dedup as dd

SF = "/root/testdata/sf0.001"


def _und_adj() -> dict[str, set[str]]:
    d = q.link_corpus()
    edges = duckdb.sql(
        f"select distinct least(src,dst) a, greatest(src,dst) b "
        f"from ({q.outlinks_oracle_sql(d)}) where src<>dst"
    ).fetchall()
    adj: dict[str, set[str]] = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _dir_out() -> dict[str, set[str]]:
    d = q.link_corpus()
    edges = duckdb.sql(
        f"select distinct src, dst from ({q.outlinks_oracle_sql(d)}) "
        f"where src<>dst"
    ).fetchall()
    out: dict[str, set[str]] = collections.defaultdict(set)
    nodes = set()
    for s, t in edges:
        out[s].add(t)
        nodes.add(s)
        nodes.add(t)
    out["__nodes__"] = nodes
    return out


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


class TestLinkKcore:
    def test_matches_python_peel(self, ray_session):
        got = q.q_link_kcore(SF).to_pandas()
        adj = _und_adj()
        alive = set(adj)
        while True:
            drop = {
                u for u in alive
                if sum(1 for v in adj[u] if v in alive) < q.KCORE_K
            }
            if not drop:
                break
            alive -= drop
        want = {
            u: sum(1 for v in adj[u] if v in alive) for u in sorted(alive)
        }
        assert dict(zip(got["url"], got["degree"])) == want
        assert len(got) == len(alive) > 0

    def test_peel_depth_under_oracle_unroll(self):
        """The SQL oracle unrolls KCORE_ROUNDS rounds; rounds past the
        fixpoint are no-ops, so correctness needs true peel depth <
        KCORE_ROUNDS on the fixture."""
        adj = _und_adj()
        alive = set(adj)
        depth = 0
        while True:
            drop = {
                u for u in alive
                if sum(1 for v in adj[u] if v in alive) < q.KCORE_K
            }
            if not drop:
                break
            alive -= drop
            depth += 1
        assert depth < q.KCORE_ROUNDS

    def test_distributed_route_equals_task_route(self, ray_session):
        und = q._und_edges_ds(q.link_corpus())
        dist = _canon(
            q._kcore_distributed(und, dd.adaptive_partitions(q.LINK_N))
            .to_pandas()
        )
        task = _canon(q.q_link_kcore(SF).to_pandas())
        pd.testing.assert_frame_equal(dist, task)


class TestLinkDistance:
    def _truth(self) -> dict[str, int]:
        out = _dir_out()
        nodes = out.pop("__nodes__")
        dist = {u: 0 for u in nodes if q._trust_seed(u)}
        frontier = set(dist)
        for k in range(1, q.LINKDIST_MAX + 1):
            nxt: set[str] = set()
            for u in frontier:
                nxt |= out.get(u, set())
            frontier = {v for v in nxt if v not in dist}
            for v in frontier:
                dist[v] = k
            if not frontier:
                break
        return dist

    def test_matches_python_bfs(self, ray_session):
        got = q.q_link_distance(SF).to_pandas()
        want = self._truth()
        assert dict(zip(got["url"], got["dist"])) == want
        assert (got["dist"] == 0).sum() > 0  # seeds present

    def test_eccentricity_under_cap(self):
        """All reachable nodes must be found within LINKDIST_MAX hops on
        the fixture, otherwise the capped engine/oracle would silently
        truncate (the no-silent-caps rule)."""
        out = _dir_out()
        nodes = out.pop("__nodes__")
        dist = {u: 0 for u in nodes if q._trust_seed(u)}
        frontier = set(dist)
        k = 0
        while frontier:
            k += 1
            nxt: set[str] = set()
            for u in frontier:
                nxt |= out.get(u, set())
            frontier = {v for v in nxt if v not in dist}
            for v in frontier:
                dist[v] = k
        assert max(dist.values()) < q.LINKDIST_MAX

    def test_distributed_route_equals_task_route(self, ray_session):
        import ray.data as rd

        pages_dir = q.link_corpus()
        edges = q._dir_edges_ds(pages_dir)
        pages = rd.read_parquet(pages_dir, columns=["url"])
        dist = _canon(
            q._linkdist_distributed(
                edges, pages, dd.adaptive_partitions(q.LINK_N)
            ).to_pandas()
        )
        task = _canon(q.q_link_distance(SF).to_pandas())
        pd.testing.assert_frame_equal(dist, task)


class TestKnnGraph:
    def test_matches_numpy_groundtruth(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        got = q.q_knn_graph(SF).to_pandas()
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = np.round(M @ M.T, 4)
        want = set()
        for i in range(len(ids)):
            order = sorted(
                (j for j in range(len(ids)) if j != i),
                key=lambda j: (-sims[i, j], ids[j]),
            )[: q.KNNG_K]
            for j in order:
                want.add((int(ids[i]), int(ids[j])))
        assert set(zip(got["vec_id"], got["neighbor_id"])) == want
        assert len(got) == len(ids) * q.KNNG_K


class TestKcenterSample:
    def test_matches_numpy_greedy(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        got = q.q_kcenter_sample(SF).to_pandas()
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        order = np.argsort(ids)
        ids, M = ids[order], M[order]
        centers = [0]  # index of min vec_id
        for _ in range(1, q.KC_K):
            msim = np.round(M @ M[centers].T, 4).max(axis=1)
            cand = [
                (msim[i], ids[i], i)
                for i in range(len(ids)) if i not in centers
            ]
            centers.append(min(cand)[2])
        sims = np.round(M @ M[centers].T, 4)
        cids = ids[centers]
        corder = np.argsort(cids)
        pick = sims[:, corder].argmax(axis=1)
        want = dict(zip(ids.tolist(), cids[corder][pick].tolist()))
        assert dict(zip(got["vec_id"], got["center_id"])) == want
        # the 8 centers assign to themselves
        for c in cids:
            assert want[int(c)] == int(c)


class TestUserRfm:
    def test_matches_pandas_groundtruth(self, ray_session):
        import math

        import numpy as np
        import pyarrow.parquet as pq

        got = q.q_user_rfm(SF).to_pandas().set_index("user_id")
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "value"]).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype("int64")
        ref = int(us.max())
        ev = ev.assign(
            us=us, cents=np.floor(ev["value"] * 100 + 0.5).astype("int64")
        )
        u = ev.groupby("user_id").agg(
            us_max=("us", "max"), f_n=("us", "size"),
            m_cents=("cents", "sum"),
        )
        u["r_days"] = (ref - u["us_max"]) // q.RFM_DAY_US
        for col, short in (("r_days", "r"), ("f_n", "f"),
                           ("m_cents", "m")):
            v = np.sort(u[col].to_numpy())
            n = len(v)
            cut = [v[((n - 1) * k) // 4] for k in (1, 2, 3)]
            u[f"{short}_score"] = (
                1 + (u[col] > cut[0]).astype(int)
                + (u[col] > cut[1]) + (u[col] > cut[2])
            )
        for c in ("r_days", "f_n", "m_cents",
                  "r_score", "f_score", "m_score"):
            assert got[c].to_dict() == u[c].to_dict(), c
        assert set(got["r_score"].unique()) <= {1, 2, 3, 4}


class TestLexicalDiversity:
    def test_matches_python_groundtruth(self, ray_session):
        import pyarrow.parquet as pq

        got = q.q_lexical_diversity(SF).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        for r in docs.itertuples():
            toks = (r.text or "").split()
            if not toks:
                assert r.doc_id not in got.index
                continue
            row = got.loc[r.doc_id]
            assert row["n_tokens"] == len(toks)
            assert row["n_types"] == len(set(toks))
            assert row["ttr_ppm"] == len(set(toks)) * 10**6 // len(toks)


class TestHapaxRate:
    def test_matches_python_groundtruth(self, ray_session):
        import collections

        import pyarrow.parquet as pq

        got = q.q_hapax_rate(SF).to_pandas().set_index("source")
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["source", "text"]).to_pandas()
        tf: dict[str, collections.Counter] = collections.defaultdict(
            collections.Counter)
        for r in docs.itertuples():
            tf[r.source].update((r.text or "").split())
        for src, c in tf.items():
            row = got.loc[src]
            hap = sum(1 for v in c.values() if v == 1)
            assert row["n_vocab"] == len(c)
            assert row["n_hapax"] == hap
            assert row["hapax_ppm"] == hap * 10**6 // len(c)
        assert len(got) == len(tf)


class TestScd2Intervals:
    def test_matches_python_groundtruth(self, ray_session):
        import hashlib

        import duckdb

        got = q.q_scd2_intervals(SF).to_pandas()
        rows = duckdb.sql(
            f"select url, warc_ts, text from "
            f"read_parquet('{q.recrawl_corpus()}/*.parquet') "
            f"order by url, warc_ts"
        ).fetchall()
        want = []
        hist: dict[str, list] = {}
        for u, ts, tx_ in rows:
            hist.setdefault(u, []).append(
                (ts, hashlib.md5((tx_ or "").encode()).hexdigest())
            )
        for u, caps in hist.items():
            ivs = []
            for ts, h in caps:
                if not ivs or ivs[-1][1] != h:
                    ivs.append([ts, h, 1])
                else:
                    ivs[-1][2] += 1
            for i, (ts, h, n) in enumerate(ivs):
                to = ivs[i + 1][0] if i + 1 < len(ivs) else None
                want.append((u, h, ts, to, n))
        got_t = sorted(
            (r.url, r.content_md5, r.valid_from.to_pydatetime(),
             None if pd.isna(r.valid_to) else r.valid_to.to_pydatetime(),
             r.n_captures)
            for r in got.itertuples()
        )
        assert got_t == sorted(want)
        # every url ends with one open interval
        assert got["valid_to"].isna().sum() == got["url"].nunique()


class TestLateEvents:
    def test_matches_pandas_groundtruth(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        got = q.q_late_events(SF).to_pandas().set_index("user_id")
        ev = (
            pq.read_table(f"{SF}/events.parquet",
                          columns=["user_id", "event_id", "ts"])
            .to_pandas()
            .sort_values(["user_id", "event_id"])
        )
        ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
        for uid, g in ev.groupby("user_id"):
            us = g["us"].to_numpy()
            run = np.maximum.accumulate(us)
            wm = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))
            late = us < wm
            row = got.loc[uid]
            assert row["n_events"] == len(us)
            assert row["n_late"] == late.sum()
            worst = int((wm - us)[late].max()) if late.any() else 0
            assert row["max_lateness_us"] == worst
