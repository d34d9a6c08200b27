"""Unit tests for the session-18 operators: Matryoshka truncation audit
(full- vs half-dimension cosine top-k overlap) and the event-type
Markov stationary distribution. Oracle value-parity is covered by the
driver gate / check_oracles; these pin the numeric semantics against
independent numpy/python ground truth, plus the invariants the designs
rely on (overlap bounded by k; stationary mass conservation up to the
integer-floor dust and dangling-state leak).
"""

import numpy as np
import pyarrow.parquet as pq

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _topk_ids(Q: np.ndarray, X: np.ndarray, ids: np.ndarray,
              k: int) -> list[list[int]]:
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    sims = np.round(Qn @ Xn.T, 4)
    out = []
    for qi in range(sims.shape[0]):
        order = sorted(range(sims.shape[1]),
                       key=lambda j: (-sims[qi, j], ids[j]))[:k]
        out.append([int(ids[j]) for j in order])
    return out


class TestEmbedMatryoshka:
    def test_matches_numpy_groundtruth(self, ray_session):
        got = (
            q.q_embed_matryoshka(SF)
            .to_pandas()
            .set_index("query_id")
            .sort_index()
        )
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]
        qids = ids[: q.N_QUERIES]
        Qf, Qh = X[: q.N_QUERIES], X[: q.N_QUERIES, : q.MRL_HALF]

        full = _topk_ids(Qf, X, ids, q.KNN_K)
        half = _topk_ids(Qh, X[:, : q.MRL_HALF], ids, q.KNN_K)
        assert len(got) == q.N_QUERIES
        for qi, qid in enumerate(qids):
            row = got.loc[int(qid)]
            want = len(set(full[qi]) & set(half[qi]))
            assert row["n_overlap"] == want
            assert 0 <= row["n_overlap"] <= row["k"] == q.KNN_K

    def test_self_is_always_shared(self, ray_session):
        # a query vector's own id tops both rankings (cos=1.0 in both
        # the full and the truncated space), so overlap is >= 1
        got = q.q_embed_matryoshka(SF).to_pandas()
        assert (got["n_overlap"] >= 1).all()


class TestEventStationary:
    def test_matches_python_groundtruth(self, ray_session):
        tr = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in q.q_event_transitions(SF).take_all()
        }
        states = sorted({a for a, _ in tr} | {b for _, b in tr})
        tot: dict[str, int] = {}
        for (a, _), n in tr.items():
            tot[a] = tot.get(a, 0) + n
        p = {s: q.EV_STAT_SCALE // len(states) for s in states}
        for _ in range(q.EV_STAT_ITERS):
            nxt = {s: 0 for s in states}
            for (a, b), n in tr.items():
                nxt[b] += (p[a] * n) // tot[a]
            p = nxt
        got = (
            q.q_event_stationary(SF)
            .to_pandas()
            .set_index("event_type")["stationary_micro"]
        )
        assert set(got.index) == set(states)
        for s in states:
            assert got[s] == p[s] // 10**6

    def test_entropy_matches_python_groundtruth(self, ray_session):
        tr = q.q_event_transitions(SF).take_all()
        tot: dict[str, int] = {}
        for r in tr:
            tot[r["prev_type"]] = tot.get(r["prev_type"], 0) + r["n"]
        got = (
            q.q_event_entropy(SF)
            .to_pandas()
            .set_index("prev_type")
        )
        for a, t in tot.items():
            ns = np.array([r["n"] for r in tr if r["prev_type"] == a],
                          dtype=np.float64)
            want = round(float(np.log(t) - (ns * np.log(ns)).sum() / t), 6)
            assert got.loc[a, "n_out"] == t
            assert got.loc[a, "entropy_nats"] == want
            # bounded by ln(branching factor)
            assert -1e-9 <= got.loc[a, "entropy_nats"] <= np.log(len(ns)) + 1e-9

    def test_mass_conserved_up_to_floor_dust(self, ray_session):
        # each round loses < 1 unit per (state, edge) to floor division
        # and the full mass of dangling states; with every event type
        # having outgoing transitions in the fixture, total stationary
        # mass must stay within iters * states^2 units of the scale
        got = q.q_event_stationary(SF).to_pandas()
        total = int(got["stationary_micro"].sum()) * 10**6
        n = len(got)
        slack = q.EV_STAT_ITERS * (n * n + n) * 10**6 + n * 10**6
        assert q.EV_STAT_SCALE - total < q.EV_STAT_SCALE * 0.05 + slack
        assert total <= q.EV_STAT_SCALE


class TestUserSurvival:
    def test_matches_pandas_groundtruth(self, ray_session):
        import pandas as pd

        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts"]).to_pandas()
        ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
        span = ev.groupby("user_id")["us"].agg(["min", "max"])
        d = np.minimum((span["max"] - span["min"]) // q.DAY_US,
                       q.SURV_MAX_D)
        got = q.q_user_survival(SF).to_pandas().set_index("day")
        total = len(span)
        assert len(got) == q.SURV_MAX_D + 1
        for day in range(q.SURV_MAX_D + 1):
            n = int((d >= day).sum())
            assert got.loc[day, "n_surviving"] == n
            assert got.loc[day, "frac_surviving"] == round(n / total, 6)
        # day 0 covers everyone; curve is monotone non-increasing
        assert got.loc[0, "n_surviving"] == total
        assert (np.diff(got["n_surviving"].to_numpy()) <= 0).all()


class TestEventCusum:
    def test_matches_python_groundtruth(self, ray_session):
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas()
        ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") \
            // q.DAY_US
        got = q.q_event_cusum(SF).to_pandas().set_index("event_type")
        for et, g in ev.groupby("event_type"):
            daily = g.groupby("day").size().sort_index()
            n = daily.to_numpy(dtype=np.int64)
            days = daily.index.to_numpy(dtype=np.int64)
            nd, tot = len(n), int(n.sum())
            s = np.cumsum(n * nd - tot)
            a = np.abs(s)
            j = int(np.lexsort((days, -a))[0])
            row = got.loc[et]
            assert row["n_days"] == nd
            assert row["total"] == tot
            assert row["cusum_max"] == a[j]
            assert row["cp_day"] == days[j]
        # the residual walk always returns to zero at the last day
        # (sum of n_i*nd - tot over all days is exactly 0)


class TestEmbedPQ:
    def test_matches_numpy_groundtruth(self, ray_session):
        got = q.q_embed_pq(SF).to_pandas().set_index("vec_id").sort_index()
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        CB = q._pq_codebooks(SF)
        assert CB.shape == (q.PQ_M, q.PQ_K, q.PQ_SUB)
        dr_all = []
        for m in range(q.PQ_M):
            S = X[:, m * q.PQ_SUB:(m + 1) * q.PQ_SUB]
            d2 = ((S[:, None, :] - CB[m][None, :, :]) ** 2).sum(axis=2)
            dr = np.round(np.sqrt(d2), 6)
            code = dr.argmin(axis=1)
            assert (got.loc[ids, f"c{m}"].to_numpy() == code).all()
            dr_all.append(dr[np.arange(len(dr)), code])
        err = np.round(
            ((dr_all[0] * dr_all[0] + dr_all[1] * dr_all[1])
             + dr_all[2] * dr_all[2]) + dr_all[3] * dr_all[3], 4)
        assert (got.loc[ids, "recon_err"].to_numpy() == err).all()

    def test_codebook_rows_encode_to_low_error(self, ray_session):
        # vectors used to seed the codebooks reconstruct no worse than
        # the corpus average (the quantizer fits its own training rows)
        got = q.q_embed_pq(SF).to_pandas().sort_values("vec_id")
        n_train = min(512, len(got))
        assert got["recon_err"].head(n_train).mean() \
            <= got["recon_err"].mean() + 1e-9
        for m in range(q.PQ_M):
            assert got[f"c{m}"].between(0, q.PQ_K - 1).all()


class TestTemporalNovelty:
    def test_matches_python_groundtruth(self, ray_session):
        from adaptive_pdf_extractor_ray.stages import dedup as dd

        pages = pq.read_table(q.recrawl_corpus()).to_pandas()
        pages["us"] = pages["warc_ts"].astype("datetime64[us]") \
            .astype("int64")
        first: dict[int, int] = {}
        per_snap: list[tuple[str, int, set]] = []
        for r in pages.itertuples():
            hs = {dd._hash64(s) - 2**63 for s in set(dd._shingles(r.text))}
            per_snap.append((r.url, r.us, hs))
            for h in hs:
                if h not in first or r.us < first[h]:
                    first[h] = r.us
        got = q.q_temporal_novelty(SF).to_pandas() \
            .set_index(["url", "ts_us"])
        assert len(got) == len(pages)
        for url, us, hs in per_snap:
            row = got.loc[(url, us)]
            novel = sum(1 for h in hs if first[h] == us)
            assert row["n_shingles"] == len(hs)
            assert row["n_novel"] == novel
            assert row["novelty_ppm"] == novel * 10**6 // max(len(hs), 1)

    def test_first_capture_is_fully_novel_sometimes(self, ray_session):
        # revision-0 captures at the earliest timestamps must contain
        # novel content; later revisions of the same doc share tokens
        got = q.q_temporal_novelty(SF).to_pandas()
        assert (got["n_novel"] > 0).any()
        assert (got["novelty_ppm"] <= 10**6).all()


class TestCoverageSample:
    def _fixture(self, tmp_path):
        # controlled vocab so the greedy runs multiple rounds: doc i
        # holds tokens [5i .. 5i+9] (10 tokens, overlapping the next
        # doc by 5) plus doc 99 holding a strict subset of doc 0
        import pyarrow as pa
        import pyarrow.parquet as pqw

        docs, ids = [], []
        for i in range(12):
            ids.append(i)
            docs.append(" ".join(f"tok{j}" for j in range(5 * i, 5 * i + 10)))
        ids.append(99)
        docs.append("tok0 tok1")
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(docs, pa.string())})
        pqw.write_table(t, str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    def test_multi_round_matches_python_greedy(self, ray_session, tmp_path):
        from adaptive_pdf_extractor_ray.stages import dedup as dd

        d = self._fixture(tmp_path)
        toks = {}
        import pyarrow.parquet as pqr
        t = pqr.read_table(f"{d}/documents.parquet")
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks[did] = set(dd._tokens(txt))
        covered: set = set()
        want = []
        for r in range(q.COVER_K):
            best = min(
                ((did, len(tk - covered)) for did, tk in toks.items()
                 if did not in {w[1] for w in want}),
                key=lambda x: (-x[1], x[0]),
            )
            if best[1] == 0:
                break
            covered |= toks[best[0]]
            want.append((r, best[0], best[1], len(covered)))
        got = q.q_coverage_sample(d).to_pandas()
        assert len(got) == len(want) > 1
        for (r, did, n_new, tot), row in zip(want, got.itertuples()):
            assert (row.round, row.doc_id, row.n_new,
                    row.covered_total) == (r, did, n_new, tot)
        # the subset doc (99) must never be selected
        assert 99 not in set(got["doc_id"])

    def test_oracle_parity_on_multi_round_fixture(self, ray_session,
                                                  tmp_path):
        import duckdb

        d = self._fixture(tmp_path)
        con = duckdb.connect()
        con.sql(f"create view documents as "
                f"select * from read_parquet('{d}/documents.parquet')")
        want = con.sql(q.coverage_oracle_sql()).fetchall()
        got = [tuple(r) for r in
               q.q_coverage_sample(d).to_pandas().itertuples(index=False)]
        assert got == [tuple(r) for r in want]


class TestLDiversity:
    def test_matches_pandas_groundtruth(self, ray_session):
        docs = pq.read_table(
            f"{SF}/documents.parquet",
            columns=["source", "lang", "n_chars"]).to_pandas()
        docs["sb"] = docs["n_chars"] // q.LDIV_BUCKET
        got = q.q_l_diversity(SF).to_pandas() \
            .set_index(["source", "lang"]).sort_index()
        grp = docs.groupby(["source", "lang"])
        assert len(got) == grp.ngroups
        for key, g in grp:
            row = got.loc[key]
            assert row["n"] == len(g)
            assert row["n_sensitive"] == g["sb"].nunique()
            assert row["at_risk"] == int(g["sb"].nunique() < q.L_DIV)


class TestMarkovPerplexity:
    def test_matches_python_groundtruth(self, ray_session):
        import collections
        import math

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "event_id", "ts", "event_type"],
        ).to_pandas().sort_values(["user_id", "ts", "event_id"])
        n_ab: dict = collections.Counter()
        for _, g in ev.groupby("user_id"):
            t = g["event_type"].tolist()
            n_ab.update(zip(t, t[1:]))
        tot: dict = collections.Counter()
        for (a, _), n in n_ab.items():
            tot[a] += n
        got = q.q_markov_perplexity(SF).to_pandas().set_index("user_id")
        for uid, g in ev.groupby("user_id"):
            t = g["event_type"].tolist()
            pairs = list(zip(t, t[1:]))
            if not pairs:
                # single-event users are dropped (oracle parity)
                assert uid not in got.index
                continue
            nll = sum(math.log(tot[a]) - math.log(n_ab[(a, b)])
                      for a, b in pairs)
            row = got.loc[uid]
            assert row["n_transitions"] == len(pairs)
            assert abs(row["nll_nats"] - nll) < 1e-5
            assert abs(row["avg_nll"] - nll / len(pairs)) < 1e-5
        # nll is non-negative (every probability <= 1)
        assert (got["nll_nats"] >= 0).all()


class TestCsvRoundtrip:
    def test_matches_parquet_source(self, ray_session):
        got = q.q_csv_roundtrip(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = pq.read_table(
            f"{SF}/documents.parquet",
            columns=["doc_id", "source", "lang", "n_chars"],
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["doc_id"] == want["doc_id"]).all()
        assert (got["source"] == want["source"]).all()
        assert (got["n_chars"] == want["n_chars"]).all()
        assert (got["len_bucket"] == want["n_chars"] // 100).all()


class TestEventGapsHist:
    def test_matches_pandas_groundtruth(self, ray_session):
        import collections

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "event_id", "ts"],
        ).to_pandas().sort_values(["user_id", "ts", "event_id"])
        ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
        want: collections.Counter = collections.Counter()
        for _, g in ev.groupby("user_id"):
            gs = np.diff(g["us"].to_numpy()) // 1_000_000
            want.update(int(v).bit_length() for v in gs)
        got = q.q_event_gaps_hist(SF).to_pandas().set_index("bucket")
        assert len(got) == len(want)
        for b, n in want.items():
            assert got.loc[b, "n"] == n
        # total gaps = total events - n_users
        assert got["n"].sum() == len(ev) - ev["user_id"].nunique()


class TestDomainGini:
    def test_matches_python_groundtruth(self, ray_session):
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["source"]).to_pandas()
        counts = sorted(
            (int(n), s) for s, n in docs["source"].value_counts().items()
        )
        k, t = len(counts), sum(n for n, _ in counts)
        s = sum(i * n for i, (n, _) in enumerate(counts, start=1))
        got = q.q_domain_gini(SF).to_pandas().iloc[0]
        assert got["n_sources"] == k
        assert got["n_docs"] == t
        assert got["gini"] == round((2 * s - (k + 1) * t) / (k * t), 6)
        assert 0.0 <= got["gini"] < 1.0

class TestAbLift:
    def test_matches_python_groundtruth(self, ray_session):
        import math

        from adaptive_pdf_extractor_ray.stages import dedup as dd

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "ts", "event_type"],
        ).to_pandas()
        ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
        conv = {}
        for u, g in ev.groupby("user_id"):
            clicks = np.sort(g.loc[g["event_type"] == "click",
                                   "us"].to_numpy())
            purch = np.sort(g.loc[g["event_type"] == "purchase",
                                  "us"].to_numpy())
            c = 0
            for pp_ in purch:
                j = np.searchsorted(clicks, pp_, side="right") - 1
                if j >= 0 and pp_ - clicks[j] <= q.AB_CONV_WINDOW_US:
                    c = 1
                    break
            conv[u] = c
        arms = {u: "A" if dd._hash64(str(u)) % 2 == 0 else "B"
                for u in conv}
        na = sum(1 for u in conv if arms[u] == "A")
        nb = len(conv) - na
        ca = sum(conv[u] for u in conv if arms[u] == "A")
        cb = sum(conv.values()) - ca
        got = q.q_ab_lift(SF).to_pandas().iloc[0]
        assert (got["n_a"], got["conv_a"], got["n_b"], got["conv_b"]) \
            == (na, ca, nb, cb)
        assert got["lift_ppm"] == ca * 10**6 // na - cb * 10**6 // nb
        if na and nb and (ca + cb) and (ca + cb) < (na + nb):
            pp = (ca + cb) / (na + nb)
            z = round((ca / na - cb / nb)
                      / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb)), 6)
        else:
            z = 0.0
        assert got["z_score"] == z
        # the windowed definition must actually discriminate
        assert 0 < ca + cb < na + nb


class TestWeekdaySeasonality:
    def test_matches_pandas_groundtruth(self, ray_session):
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas()
        us = ev["ts"].astype("datetime64[us]").astype("int64")
        ev["dow"] = (us // q.DAY_US + 4) % 7
        got = q.q_weekday_seasonality(SF).to_pandas() \
            .set_index(["event_type", "dow"])
        grp = ev.groupby(["event_type", "dow"]).size()
        tot = ev.groupby("event_type").size()
        assert len(got) == len(grp)
        for (et, dow), n in grp.items():
            row = got.loc[(et, dow)]
            assert row["n"] == n
            assert row["share_ppm"] == n * 10**6 // tot[et]
            assert row["index_ppm"] == n * 7 * 10**6 // tot[et]
        # dow convention: 1970-01-01 (day 0) must map to Thursday
        assert (0 + 4) % 7 == 4
        # shares per type sum to <= 1e6 (floor dust only)
        s = got.groupby(level=0)["share_ppm"].sum()
        assert ((10**6 - s) < 7).all() and (s <= 10**6).all()


class TestGraphAssortativity:
    def test_matches_networkx_free_groundtruth(self, ray_session):
        import collections
        import duckdb

        d = q.link_corpus()
        edges = duckdb.sql(
            f"select distinct least(src,dst), greatest(src,dst) "
            f"from ({q.outlinks_oracle_sql(d)}) where src<>dst"
        ).fetchall()
        deg: collections.Counter = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        xs, ys = [], []
        for a, b in edges:
            xs += [deg[a], deg[b]]
            ys += [deg[b], deg[a]]
        m = len(xs)
        sx, sxx = sum(xs), sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        den = m * sxx - sx * sx
        want = round((m * sxy - sx * sx) / den, 6) if den else 0.0
        got = q.q_graph_assortativity(SF).to_pandas().iloc[0]
        assert got["n_edges"] == len(edges)
        assert got["assortativity"] == want
        assert -1.0 <= got["assortativity"] <= 1.0


class TestAttributionDelay:
    def test_matches_python_groundtruth(self, ray_session):
        import collections

        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "ts", "event_type"],
        ).to_pandas()
        ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
        delays: list[int] = []
        for _, g in ev.groupby("user_id"):
            clicks = np.sort(
                g.loc[g["event_type"] == "click", "us"].to_numpy())
            for pp_ in g.loc[g["event_type"] == "purchase",
                             "us"].to_numpy():
                j = np.searchsorted(clicks, pp_, side="right") - 1
                if j >= 0:
                    delays.append(int((pp_ - clicks[j]) // 1_000_000))
        delays.sort()
        got = q.q_attribution_delay(SF).to_pandas().iloc[0]
        assert got["n_delays"] == len(delays)

        def pct(q100):
            need = -(-q100 * len(delays) // 100)
            return delays[need - 1]

        assert got["p50_s"] == pct(50)
        assert got["p90_s"] == pct(90)
        assert got["p99_s"] == pct(99)
        assert got["p50_s"] <= got["p90_s"] <= got["p99_s"]


class TestLabelProp:
    def _ground_truth(self):
        import collections
        import duckdb

        d = q.link_corpus()
        edges = duckdb.sql(
            f"select distinct least(src,dst), greatest(src,dst) "
            f"from ({q.outlinks_oracle_sql(d)}) where src<>dst"
        ).fetchall()
        adj: dict = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        lab = {v: v for v in adj}
        for _ in range(q.LP_ITERS):
            nxt = {}
            for v, nbrs in adj.items():
                c = collections.Counter(lab[u] for u in nbrs)
                nxt[v] = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            lab = nxt
        return lab

    def test_matches_python_groundtruth(self, ray_session):
        want = self._ground_truth()
        got = q.q_label_prop(SF).to_pandas().set_index("url")["community"]
        assert len(got) == len(want)
        for v, l in want.items():
            assert got[v] == l
        # propagation must coarsen: fewer communities than nodes
        assert got.nunique() < len(got)


class TestRowgroupPrune:
    def test_matches_footer_and_data(self, ray_session):
        import pyarrow.parquet as pqr

        path = q.rowgroup_corpus(SF)
        got = q.q_rowgroup_prune(SF).to_pandas()
        pf = pqr.ParquetFile(path)
        assert len(got) == pf.num_row_groups
        # stats must be TRUE bounds of the actual data per group, and
        # prunable groups must contain no row matching the predicate
        for g in range(pf.num_row_groups):
            rows = pf.read_row_group(g, columns=["n_chars"]) \
                .to_pandas()["n_chars"]
            r = got.iloc[g]
            assert r["row_group_id"] == g
            assert r["n_rows"] == len(rows)
            assert r["min_n_chars"] == rows.min()
            assert r["max_n_chars"] == rows.max()
            assert r["prunable"] == int(rows.max() <= q.PRUNE_NCHARS)
            if r["prunable"]:
                assert not (rows > q.PRUNE_NCHARS).any()

    def test_pruning_actually_saves(self, ray_session):
        # the sorted mirror must make SOME groups prunable and SOME not
        got = q.q_rowgroup_prune(SF).to_pandas()
        assert 0 < got["prunable"].sum() < len(got)


class TestEventBurstiness:
    def test_matches_python_groundtruth(self, ray_session):
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"]).to_pandas()
        ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") \
            // q.DAY_US
        got = q.q_event_burstiness(SF).to_pandas() \
            .set_index("event_type")
        for et, g in ev.groupby("event_type"):
            n = [int(v) for v in g.groupby("day").size()]
            nd, s1 = len(n), sum(n)
            s2 = sum(v * v for v in n)
            want = ((nd * s2 - s1 * s1) * 10**6 // ((nd - 1) * s1)
                    if nd > 1 and s1 else 0)
            row = got.loc[et]
            assert row["n_days"] == nd
            assert row["total"] == s1
            assert row["fano_ppm"] == want
            assert row["fano_ppm"] >= 0


class TestCrawlBudget:
    def test_matches_python_groundtruth(self, ray_session):
        import math

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["source"]).to_pandas()
        counts = docs["source"].value_counts().to_dict()
        w = {s: math.isqrt(int(n)) for s, n in counts.items()}
        tw = sum(w.values())
        got = q.q_crawl_budget(SF).to_pandas().set_index("source")
        assert len(got) == len(counts)
        for s, n in counts.items():
            row = got.loc[s]
            assert row["n_docs"] == n
            assert row["weight"] == w[s]
            assert row["budget"] == q.CRAWL_BUDGET_TOTAL * w[s] // tw
        # allocation never exceeds the cycle budget (floor dust only)
        assert got["budget"].sum() <= q.CRAWL_BUDGET_TOTAL
        # sublinear: budget ratio < doc ratio for any dominant source
        big = got["n_docs"].idxmax()
        small = got["n_docs"].idxmin()
        if got.loc[big, "n_docs"] > got.loc[small, "n_docs"]:
            assert (got.loc[big, "budget"] / max(got.loc[small, "budget"], 1)
                    <= got.loc[big, "n_docs"] / got.loc[small, "n_docs"])


class TestLengthLognormal:
    def test_matches_python_groundtruth(self, ray_session):
        import math

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["source", "n_chars"]).to_pandas()
        got = q.q_length_lognormal(SF).to_pandas().set_index("source")
        for s, g in docs.groupby("source"):
            li = np.round(
                np.log(np.maximum(g["n_chars"].to_numpy(dtype=float),
                                  1.0)) * 1e6
            ).astype(np.int64)
            n, sl, sll = len(li), int(li.sum()), int((li * li).sum())
            mu = sl / (n * 1_000_000)
            ex2 = sll / (n * 1_000_000_000_000)
            var = max(ex2 - mu * mu, 0.0)
            row = got.loc[s]
            assert row["n_docs"] == n
            assert row["mu"] == round(mu, 6)
            assert row["sigma"] == round(math.sqrt(var), 6)
            assert row["sigma"] >= 0


class TestUserFeatures:
    def test_matches_pandas_groundtruth_and_no_leakage(self, ray_session):
        ev = pq.read_table(
            f"{SF}/events.parquet",
            columns=["user_id", "ts", "event_type"],
        ).to_pandas()
        ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
        lo, hi = int(ev["us"].min()), int(ev["us"].max())
        cut = lo + (hi - lo) * q.CHURN_CUT_RATIO // 100
        got = q.q_user_features(SF).to_pandas().set_index("user_id")
        pre = ev[ev["us"] <= cut]
        post_users = set(ev.loc[ev["us"] > cut, "user_id"])
        assert len(got) == pre["user_id"].nunique()
        for uid, g in pre.groupby("user_id"):
            row = got.loc[uid]
            assert row["n_events"] == len(g)
            assert row["n_types"] == g["event_type"].nunique()
            assert row["n_purchases"] == (g["event_type"] == "purchase").sum()
            assert row["active_days"] == (g["us"] // q.DAY_US).nunique()
            assert row["recency_s"] == (cut - g["us"].max()) // 1_000_000
            assert row["label_retained"] == int(uid in post_users)
        # features never use post-cutoff rows: recency is non-negative
        assert (got["recency_s"] >= 0).all()
        # both label classes exist at a 70% cut on this fixture
        assert got["label_retained"].nunique() >= 1
