"""Unit tests for the session-16 operators: per-user event-type Markov
transitions, global embedding standardization / covariance (the
distributed-PCA reduction), broadcast-query copy search, and the
quality-signal correlation audit. Oracle value-parity is covered by the
driver gate / check_oracles; these pin the numeric semantics against
independent numpy/pandas ground truth.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import adaptive_pdf_extractor_ray.stages.dedup as dd
from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _emb_matrix() -> np.ndarray:
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return np.asarray(t["embedding"].to_pylist(), dtype=np.float64)


class TestEventTransitions:
    def test_matches_pandas_groundtruth(self, ray_session):
        got = q.q_event_transitions(SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        ev["prev"] = ev.groupby("user_id")["event_type"].shift(1)
        truth = (
            ev.dropna(subset=["prev"])
            .groupby(["prev", "event_type"])
            .size()
            .reset_index(name="n")
        )
        gm = {
            (r.prev_type, r.next_type): r.n for r in got.itertuples()
        }
        tm = {(r.prev, r.event_type): r.n for r in truth.itertuples()}
        assert gm == tm
        # conservation: one transition per event after each user's first
        n_users = ev["user_id"].nunique()
        assert sum(gm.values()) == len(ev) - n_users


class TestEmbedStandardize:
    def test_zscores_match_numpy(self, ray_session):
        got = q.q_embed_standardize(SF).to_pandas()
        X = _emb_matrix()
        m = X.sum(axis=0) / len(X)
        sd = np.sqrt(np.maximum((X * X).sum(axis=0) / len(X) - m * m, 0.0))
        safe = np.where(sd == 0.0, 1.0, sd)
        Z = np.round((X - m) / safe, 6)
        Z = np.where(sd[None, :] == 0.0, 0.0, Z)
        t = pq.read_table(f"{SF}/embeddings.parquet")
        vec_ids = t["vec_id"].to_pylist()
        piv = got.set_index(["vec_id", "pos"])["z"]
        for row, vid in enumerate(vec_ids[:50]):
            for pos in (1, 17, 64):
                assert piv[(vid, pos)] == Z[row, pos - 1]
        # standardized moments: mean 0, population std 1 per live dim
        zm = got.groupby("pos")["z"].mean()
        zs = got.groupby("pos")["z"].std(ddof=0)
        assert np.allclose(zm.values, 0.0, atol=1e-5)
        live = sd > 0
        assert np.allclose(zs.values[live], 1.0, atol=1e-4)


class TestEmbedCovariance:
    def test_matches_numpy_cov(self, ray_session):
        got = q.q_embed_covariance(SF).to_pandas()
        X = _emb_matrix()
        C = np.cov(X, rowvar=False, ddof=0)
        assert len(got) == 64 * 65 // 2
        for r in got.itertuples():
            assert abs(r.cov - C[r.i - 1, r.j - 1]) < 2e-6
        # upper triangle only, 1-based
        assert (got["i"] <= got["j"]).all()
        assert got["i"].min() == 1 and got["j"].max() == 64


class TestCopySearch:
    def test_topk_matches_bruteforce(self, ray_session):
        got = q.q_copy_search(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        qid = docs["doc_id"].min()
        qset = set(
            dd._shingles(docs.loc[docs.doc_id == qid, "text"].iloc[0] or "")
        )
        scores = sorted(
            (
                (-len(qset.intersection(dd._shingles(r.text or ""))), r.doc_id)
                for r in docs.itertuples()
                if r.doc_id != qid
            )
        )[: q.COPY_SEARCH_K]
        expect = [(-s, i) for s, i in scores]
        assert list(zip(got["n_common"], got["doc_id"])) == expect
        assert (got["n_query"] == len(qset)).all()
        assert (got["n_common"] <= got["n_query"]).all()
        assert qid not in set(got["doc_id"])


class TestEmbedPca:
    def test_projection_matches_numpy_pca(self, ray_session):
        got = q.q_embed_pca(SF).to_pandas().set_index("vec_id")["pc1"]
        X = _emb_matrix()
        n = len(X)
        m = X.sum(axis=0) / n
        C = (X.T @ X) / n - np.outer(m, m)
        w, V = np.linalg.eigh((C + C.T) / 2.0)
        v = V[:, -1]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        expect = (X - m) @ v
        t = pq.read_table(f"{SF}/embeddings.parquet")
        for row, vid in enumerate(t["vec_id"].to_pylist()):
            assert abs(got[vid] - expect[row]) < 1e-5
        # the projection captures the dominant eigenvalue's variance
        assert abs(got.to_numpy().var() - w[-1]) < 1e-3
        assert got.to_numpy().std() > 0.1, "PC1 must be non-degenerate"


class TestJoinStorageBucketed:
    def test_matches_plain_join(self, ray_session):
        got = (
            q.q_join_storage_bucketed(SF)
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        ref = (
            q.q_join_large(SF)
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["o_orderpriority", "revenue", "n_lineitems"]],
            ref[["o_orderpriority", "revenue", "n_lineitems"]],
        )

    def test_bucketed_rewrite_memoized_and_complete(self, ray_session):
        import glob
        import os

        root = q._bucketed_join_tables(SF)
        assert os.path.exists(os.path.join(root, "_DONE"))
        assert root == q._bucketed_join_tables(SF)  # second call: memo hit
        # every row landed in exactly one bucket
        li = pq.read_table(f"{SF}/lineitem.parquet")
        n_bucketed = sum(
            pq.read_table(f).num_rows
            for f in glob.glob(
                os.path.join(root, "lineitem", "bucket=*", "*.parquet")
            )
        )
        assert n_bucketed == li.num_rows
        # bucket invariant: files under bucket=k hold only keys with
        # key & (B-1) == k
        for k in (0, q.JSB_BUCKETS - 1):
            fs = glob.glob(
                os.path.join(root, "lineitem", f"bucket={k}", "*.parquet")
            )
            for f in fs[:2]:
                keys = pq.read_table(f)["l_orderkey"].to_numpy()
                assert ((keys & (q.JSB_BUCKETS - 1)) == k).all()


class TestAggIncremental:
    def test_equals_full_recompute(self, ray_session):
        got = (
            q.q_agg_incremental(SF)
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True)
        )
        li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
        li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
        truth = (
            li.groupby(["l_returnflag", "l_linestatus"])
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_revenue=("rev", "sum"),
                sum_disc=("l_discount", "sum"),
                n=("rev", "size"),
            )
            .reset_index()
            .sort_values(["l_returnflag", "l_linestatus"])
            .reset_index(drop=True)
        )
        assert list(got["n"]) == list(truth["n"])
        assert np.allclose(got["sum_qty"], truth["sum_qty"].round(2))
        assert np.allclose(got["sum_revenue"], truth["sum_revenue"], atol=0.02)
        assert np.allclose(
            got["avg_disc"], truth["sum_disc"] / truth["n"], atol=1e-5
        )


class TestDomainEntropy:
    def test_matches_direct_formula(self, ray_session):
        got = q.q_domain_entropy(SF).to_pandas().iloc[0]
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        c = docs["source"].value_counts()
        p = c / c.sum()
        h = -(p * np.log(p)).sum()
        assert got["n_sources"] == len(c)
        assert abs(got["entropy_nats"] - h) < 1e-5
        assert abs(got["top_share"] - p.max()) < 1e-6
        # entropy bounded by uniform
        assert got["entropy_nats"] <= math.log(len(c)) + 1e-9


class TestBpeRouteEquivalence:
    def test_driver_route_equals_distributed(self, ray_session, monkeypatch):
        q._bpe_learn_cached.cache_clear()
        fast = q._bpe_learn(SF)
        q._bpe_learn_cached.cache_clear()
        monkeypatch.setattr(q.qwarc, "BPE_DRIVER_VOCAB_CAP", 0)
        slow = q._bpe_learn(SF)
        q._bpe_learn_cached.cache_clear()
        assert fast == slow
        assert len(fast) == q.BPE_MERGES


class TestSnapshotEditdist:
    def test_matches_reference_dp(self, ray_session):
        got = (
            q.q_snapshot_editdist(SF)
            .to_pandas()
            .set_index("url")["editdist"]
        )
        a_dir, b_dir = q.crawl_diff_corpus()
        a = pq.read_table(a_dir).to_pandas().set_index("url")["text"]
        b = pq.read_table(b_dir).to_pandas().set_index("url")["text"]
        common = sorted(set(a.index) & set(b.index))
        assert sorted(got.index) == common

        def ref_lev(x: bytes, y: bytes) -> int:
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x):
                cur = [i + 1]
                for j, cy in enumerate(y):
                    cur.append(
                        min(prev[j] + (cx != cy), prev[j + 1] + 1,
                            cur[j] + 1)
                    )
                prev = cur
            return prev[-1]

        for url in common[:30]:
            expect = ref_lev(
                (a[url] or "")[: q.EDITDIST_CAP].encode(),
                (b[url] or "")[: q.EDITDIST_CAP].encode(),
            )
            assert got[url] == expect
        # unchanged pages exist and score 0; changed pages score > 0
        assert (got == 0).any() and (got > 0).any()

    def test_lev_bytes_random_vs_reference(self):
        rng = np.random.RandomState(11)

        def ref(x: bytes, y: bytes) -> int:
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x):
                cur = [i + 1]
                for j, cy in enumerate(y):
                    cur.append(
                        min(prev[j] + (cx != cy), prev[j + 1] + 1,
                            cur[j] + 1)
                    )
                prev = cur
            return prev[-1]

        for _ in range(60):
            la, lb = rng.randint(0, 24, size=2)
            a = bytes(rng.randint(97, 101, size=la).tolist())
            b = bytes(rng.randint(97, 101, size=lb).tolist())
            assert q._lev_bytes(a, b) == ref(a, b)

    def test_lev_bytes_properties(self):
        assert q._lev_bytes(b"", b"") == 0
        assert q._lev_bytes(b"abc", b"") == 3
        assert q._lev_bytes(b"", b"xy") == 2
        assert q._lev_bytes(b"kitten", b"sitting") == 3
        assert q._lev_bytes(b"abc", b"abc") == 0
        # symmetry + triangle-ish sanity
        assert q._lev_bytes(b"abcd", b"bcde") == q._lev_bytes(
            b"bcde", b"abcd"
        )


class TestDomainSimilarity:
    def test_signatures_merge_and_bounds(self, ray_session):
        got = q.q_domain_similarity(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        srcs = sorted(docs["source"].unique())
        assert len(got) == len(srcs) * (len(srcs) - 1) // 2
        assert (got["agree"] >= 0).all()
        assert (got["agree"] <= 32).all()
        assert np.allclose(got["est_jaccard"], got["agree"] / 32.0)
        # ground truth: domain signature == elementwise min over doc sigs
        import adaptive_pdf_extractor_ray.stages.dedup as dd2

        mh = dd2.MinHasher()
        s0 = srcs[0]
        texts = docs.loc[docs.source == s0, "text"]
        sigs = [
            mh.signature(t) for t in texts if dd2._tokens(t or "")
        ]
        expect_sig = np.minimum.reduce(sigs)
        s1 = srcs[1]
        sigs1 = [
            mh.signature(t)
            for t in docs.loc[docs.source == s1, "text"]
            if dd2._tokens(t or "")
        ]
        expect_agree = int((expect_sig == np.minimum.reduce(sigs1)).sum())
        row = got[(got.src_a == s0) & (got.src_b == s1)]
        assert int(row["agree"].iloc[0]) == expect_agree


class TestZipfSlope:
    def test_matches_polyfit(self, ray_session):
        got = q.q_zipf_slope(SF).to_pandas().iloc[0]
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        from collections import Counter as C

        counts = C(
            w for s in docs["text"] for w in (s or "").split(" ") if w
        )
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            : q.ZIPF_TOP_K
        ]
        x = np.log(np.arange(1, len(top) + 1))
        y = np.log([n for _, n in top])
        slope = np.polyfit(x, y, 1)[0]
        assert got["k_terms"] == len(top)
        assert abs(got["slope"] - slope) < 1e-4
        assert got["slope"] < 0  # frequencies decay with rank


class TestFirstSeen:
    def test_matches_pandas_groundtruth(self, ray_session):
        import hashlib

        got = q.q_first_seen(SF).to_pandas().set_index("fp")
        pages = pq.read_table(q.recrawl_corpus()).to_pandas()
        pages["fp"] = pages["text"].map(
            lambda s: hashlib.md5((s or "").encode()).hexdigest()
        )
        for fp, g in pages.groupby("fp"):
            first = g["warc_ts"].min()
            canon = g.loc[g.warc_ts == first, "url"].min()
            assert got.loc[fp, "first_ts"] == first
            assert got.loc[fp, "canonical_url"] == canon
            assert got.loc[fp, "n_captures"] == len(g)
        assert len(got) == pages["fp"].nunique()
        # conservation: every capture attributed exactly once
        assert got["n_captures"].sum() == len(pages)


class TestCorpusKl:
    def test_matches_direct_formula(self, ray_session):
        got = q.q_corpus_kl(SF).to_pandas().set_index("source")["kl"]
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        from collections import Counter as C

        counts = C(
            w for s in docs["text"] for w in (s or "").split(" ") if w
        )
        top = [
            t
            for t, _ in sorted(
                counts.items(), key=lambda kv: (-kv[1], kv[0])
            )[: q.CORPUS_KL_TOP_K]
        ]
        tset = set(top)
        st = {}
        for src, g in docs.groupby("source"):
            c = C(
                w
                for s in g["text"]
                for w in (s or "").split(" ")
                if w in tset
            )
            if c:
                st[src] = c
        gl = {t: sum(c.get(t, 0) for c in st.values()) for t in top}
        nn = sum(gl.values())
        k = len(top)
        for src, c in st.items():
            ns = sum(c.values())
            kl = sum(
                ((c.get(t, 0) + 1) / (ns + k))
                * math.log(
                    ((c.get(t, 0) + 1) / (ns + k))
                    / ((gl[t] + 1) / (nn + k))
                )
                for t in top
            )
            assert abs(got[src] - kl) < 1e-5
        assert (got >= 0).all() is not None  # KL of smoothed dists >= ~0
        assert got.min() > -1e-6


class TestSessionPaths:
    def test_matches_pandas_groundtruth(self, ray_session):
        got = q.q_session_paths(SF).to_pandas()
        ev = (
            pq.read_table(f"{SF}/events.parquet")
            .to_pandas()
            .sort_values(["user_id", "ts", "event_id"])
        )
        from collections import Counter as C

        c: C = C()
        for _, g in ev.groupby("user_id"):
            ts = g["ts"].astype("int64").to_numpy()
            cur = []
            for i, ty in enumerate(g["event_type"]):
                if cur and ts[i] - ts[i - 1] > q.SESSION_GAP_S * 1_000_000:
                    c[">".join(cur)] += 1
                    cur = []
                cur.append(ty)
            if cur:
                c[">".join(cur)] += 1
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[
            : q.SESSION_PATH_TOP_K
        ]
        assert list(zip(got["path"], got["n"])) == top
        # total sessions conserved across the full path multiset
        assert sum(c.values()) >= got["n"].sum()


class TestEventAnomaly:
    def test_flags_match_median_mad(self, ray_session):
        import statistics

        got = q.q_event_anomaly(SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        hours = (ev["ts"].astype("int64") // 3_600_000_000).value_counts()
        assert len(got) == len(hours)
        med = statistics.median(hours.values.tolist())
        mad = statistics.median([abs(n - med) for n in hours.values])
        for r in got.itertuples():
            assert r.n == hours[r.hour]
            assert r.is_outlier == (1 if abs(r.n - med) > 3 * mad else 0)


class TestAudienceOverlap:
    def test_matches_set_jaccard(self, ray_session):
        got = q.q_audience_overlap(SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        users = {
            t: set(g["user_id"]) for t, g in ev.groupby("event_type")
        }
        types = sorted(users)
        assert len(got) == len(types) * (len(types) - 1) // 2
        for r in got.itertuples():
            inter = len(users[r.type_a] & users[r.type_b])
            union = len(users[r.type_a] | users[r.type_b])
            assert r.n_both == inter
            assert abs(r.jaccard - inter / union) < 1e-6


class TestProfileTable:
    def test_matches_pandas_profile(self, ray_session):
        got = (
            q.q_profile_table(SF).to_pandas().set_index("column")
        )
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        assert (got["n_rows"] == len(orders)).all()
        for c in q.PROFILE_COLUMNS:
            assert got.loc[c, "n_null"] == orders[c].isna().sum()
            assert got.loc[c, "n_distinct"] == orders[c].nunique()

    def test_null_column_profiled(self, ray_session, tmp_path):
        import pyarrow.parquet as pq_

        t = pa.table(
            {
                "o_orderkey": pa.array([1, 2, None, 2], pa.int64()),
                "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
                "o_orderstatus": pa.array(["A", None, None, "B"]),
                "o_totalprice": pa.array([1.0, 2.0, 2.0, None]),
                "o_orderdate": pa.array(
                    [None, None, None, None], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["x", "x", "y", "z"]),
            }
        )
        pq_.write_table(t, str(tmp_path / "orders.parquet"))
        got = (
            q.q_profile_table(str(tmp_path))
            .to_pandas()
            .set_index("column")
        )
        assert got.loc["o_orderkey", "n_null"] == 1
        assert got.loc["o_orderkey", "n_distinct"] == 2
        assert got.loc["o_orderstatus", "n_null"] == 2
        assert got.loc["o_orderstatus", "n_distinct"] == 2
        assert got.loc["o_orderdate", "n_null"] == 4
        assert got.loc["o_orderdate", "n_distinct"] == 0
        assert got.loc["o_totalprice", "n_distinct"] == 2


class TestKAnonymity:
    def test_matches_pandas_groups(self, ray_session):
        got = q.q_k_anonymity(SF).to_pandas()
        cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
        truth = (
            cust.groupby(["c_nationkey", "c_mktsegment"])
            .size()
            .reset_index(name="n")
        )
        assert len(got) == len(truth)
        gm = {
            (r.c_nationkey, r.c_mktsegment): (r.n, r.at_risk)
            for r in got.itertuples()
        }
        for r in truth.itertuples():
            n, flag = gm[(r.c_nationkey, r.c_mktsegment)]
            assert n == r.n
            assert flag == (1 if r.n < q.K_ANON else 0)


class TestDedupEditdist:
    def test_pairs_match_direct_dp(self, ray_session):
        got = q.q_dedup_editdist(SF).to_pandas()
        docs = (
            pq.read_table(f"{SF}/documents.parquet")
            .to_pandas()
            .set_index("doc_id")["text"]
        )
        assert len(got) > 0
        for r in got.itertuples():
            xa = (docs[r.a] or "")[: q.EDITDIST_CAP].encode()
            xb = (docs[r.b] or "")[: q.EDITDIST_CAP].encode()
            d = q._lev_bytes(xa, xb)
            m = max(len(xa), len(xb))
            assert r.editdist == d
            assert r.sim_ppm == ((m - d) * 1_000_000 // m if m else 1_000_000)
        # LSH candidates are near-dups: the verify scores should skew high
        assert got["sim_ppm"].max() > 500_000


class TestPhashClusters:
    def test_components_cover_pair_graph(self, ray_session):
        pairs = q.q_media_phash_pairs(SF).to_pandas()
        got = q.q_dedup_phash_clusters(SF).to_pandas()
        nodes = set(pairs["a"]) | set(pairs["b"])
        assert set(got["doc_id"]) == nodes
        lab = dict(zip(got["doc_id"], got["rep_id"]))
        # edge endpoints share a label; labels are component minima
        for r in pairs.itertuples():
            assert lab[r.a] == lab[r.b]
        for d, rep in lab.items():
            assert rep <= d
            assert lab[rep] == rep


class TestMonthlyGrowth:
    def test_matches_pandas_lag(self, ray_session):
        got = q.q_monthly_growth(SF).to_pandas()
        orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
        orders["ym"] = (
            orders["o_orderdate"].dt.year * 100
            + orders["o_orderdate"].dt.month
        )
        rev = (
            orders.groupby("ym")["o_totalprice"].sum().round(2).sort_index()
        )
        assert len(got) == len(rev) - 1
        for r in got.itertuples():
            prev = rev[rev.index < r.ym].iloc[-1]
            assert r.revenue == rev[r.ym]
            assert abs(r.growth - (rev[r.ym] / prev - 1.0)) < 1e-6


class TestLangConfusion:
    def test_counts_conserve_and_match(self, ray_session):
        got = q.q_lang_confusion(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        assert got["n"].sum() == len(docs)
        pred = q.q_lang_id(SF).to_pandas().set_index("doc_id")[
            "predicted_lang"
        ]
        docs = docs.set_index("doc_id")
        truth = (
            pd.DataFrame(
                {"lang": docs["lang"], "predicted_lang": pred}
            )
            .groupby(["lang", "predicted_lang"])
            .size()
        )
        gm = {
            (r.lang, r.predicted_lang): r.n for r in got.itertuples()
        }
        assert gm == truth.to_dict()


class TestDedupFunnel:
    def test_monotone_and_consistent_with_curate(self, ray_session):
        got = (
            q.q_dedup_funnel(SF)
            .to_pandas()
            .sort_values("stage_idx")
            .reset_index(drop=True)
        )
        assert list(got["stage"]) == [
            "input", "quality", "lang", "exact_dedup",
        ]
        ns = list(got["n"])
        assert ns == sorted(ns, reverse=True)  # survivors only shrink
        docs = pq.read_table(f"{SF}/documents.parquet")
        assert ns[0] == docs.num_rows
        # final stage equals the curate chain's kept-row count
        assert ns[3] == q.q_curate(SF).count()


class TestSignalCorrelation:
    def test_matches_numpy_corrcoef(self, ray_session):
        got = q.q_signal_correlation(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        import re

        c = docs["text"].str.len().to_numpy(dtype=np.int64)
        tk = docs["text"].map(
            lambda s: len(re.findall(r"\S+", s or ""))
        ).to_numpy(dtype=np.int64)
        dg = docs["text"].map(
            lambda s: len(set(dd._tokens(s or "")))
        ).to_numpy(dtype=np.int64)
        sig = {"chars": c, "tokens": tk, "types": dg}
        assert len(got) == 3
        for r in got.itertuples():
            expect = np.corrcoef(sig[r.sig_a], sig[r.sig_b])[0, 1]
            assert abs(r.corr - expect) < 1e-5
        # correlations are true correlations: bounded and non-degenerate
        assert (got["corr"].abs() <= 1.0).all()
