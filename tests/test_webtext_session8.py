"""Unit tests for the session-8 operators: cohort retention, per-session
stats, intra-domain link components, triangle counting. (Oracle
value-parity is covered by the driver gate / check_oracles; these pin
the semantic edge cases the SQL compare can't isolate.)
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


class TestCohortRetention:
    def test_offsets_anchor_to_first_day(self, ray_session, tmp_path):
        t0 = pd.Timestamp("2025-03-01 10:00:00")
        day = pd.Timedelta(days=1)
        rows = [
            # user 1: active day 0 and day 2
            (1, t0, 1, "view", 0.0),
            (2, t0 + day * 2, 1, "view", 0.0),
            # user 2: joins a day later, active once
            (3, t0 + day, 2, "view", 0.0),
            # user 1 again on day 0 (same-day dup must not double count)
            (4, t0 + pd.Timedelta(hours=5), 1, "click", 0.0),
        ]
        sf = _write_events(tmp_path, rows)
        df = (
            q.QUERIES["cohort_retention"](sf)
            .to_pandas()
            .set_index(["cohort_day", "day_offset"])["n_users"]
        )
        d0 = pd.Timestamp("2025-03-01")
        d1 = pd.Timestamp("2025-03-02")
        assert df[(d0, 0)] == 1
        assert df[(d0, 2)] == 1
        assert df[(d1, 0)] == 1
        assert len(df) == 3

    def test_every_cohort_has_offset_zero(self, ray_session):
        df = q.QUERIES["cohort_retention"](SF).to_pandas()
        zero = df[df["day_offset"] == 0].set_index("cohort_day")
        for c in df["cohort_day"].unique():
            assert c in zero.index
        # offset-0 count is the cohort size: no later offset can exceed it
        m = df.groupby("cohort_day")["n_users"].max()
        assert (zero["n_users"] >= m.loc[zero.index] * 0 + 0).all()
        merged = df.merge(
            zero["n_users"].rename("c0"), left_on="cohort_day",
            right_index=True,
        )
        assert (merged["n_users"] <= merged["c0"]).all()


class TestSessionStats:
    def test_gap_splits_and_revenue_micro(self, ray_session, tmp_path):
        t0 = pd.Timestamp("2025-03-01 10:00:00")
        rows = [
            (1, t0, 7, "view", 1.25),
            (2, t0 + pd.Timedelta(seconds=10), 7, "purchase", 10.50),
            # > 30 min gap: new session
            (3, t0 + pd.Timedelta(seconds=10 + 1801), 7, "view", 0.0),
        ]
        sf = _write_events(tmp_path, rows)
        df = (
            q.QUERIES["session_stats"](sf)
            .to_pandas()
            .sort_values("session_idx")
            .reset_index(drop=True)
        )
        assert len(df) == 2
        assert df.loc[0, "n_events"] == 2
        assert df.loc[0, "duration_us"] == 10_000_000
        assert df.loc[0, "n_purchases"] == 1
        assert df.loc[0, "revenue_micro"] == 11_750_000
        assert df.loc[1, "n_events"] == 1
        assert df.loc[1, "duration_us"] == 0

    def test_session_count_matches_sessionize(self, ray_session):
        per_session = q.QUERIES["session_stats"](SF).to_pandas()
        per_user = q.QUERIES["sessionize"](SF).to_pandas()
        got = per_session.groupby("user_id").agg(
            n_sessions=("session_idx", "max"), n_events=("n_events", "sum")
        )
        want = per_user.set_index("user_id")[["n_sessions", "n_events"]]
        pd.testing.assert_frame_equal(
            got.sort_index(), want.sort_index(), check_like=True,
            check_dtype=False,
        )


class TestLinkComponents:
    def test_twenty_intra_domain_chains(self, ray_session):
        df = q.QUERIES["link_components"](SF).to_pandas()
        assert len(df) == q.LINK_N
        # v3 corpus: each of the 20 sites is one nav chain
        assert df["component"].nunique() == 20
        sizes = df.groupby("component").size()
        assert (sizes == q.LINK_N // 20).all()
        # a component never spans domains
        host = df["url"].str.extract(r"https://([^/]+)/")[0]
        assert (
            df.assign(h=host).groupby("component")["h"].nunique() == 1
        ).all()

    def test_rep_is_min_hash_member(self, ray_session):
        df = q.QUERIES["link_components"](SF).to_pandas()
        reps = df.groupby("component").apply(
            lambda g: min(g["url"], key=q._h60), include_groups=False
        )
        assert (reps.index == reps.values).all()


class TestTriangles:
    def test_count_matches_bruteforce(self, ray_session):
        import itertools

        got = q.QUERIES["graph_triangles"](SF)["n_triangles"][0].as_py()
        pages_dir = q.link_corpus()
        e = q._outlinks_ds(pages_dir).to_pandas()
        und = set()
        for s, d in zip(e["src"], e["dst"]):
            if s != d:
                und.add((min(s, d), max(s, d)))
        adj: dict = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        n = 0
        for a, b in und:
            n += len((adj[a] & adj[b]) - {a, b})
        # each triangle is counted once per edge -> exactly 3 times
        assert n % 3 == 0
        assert got == n // 3
        assert got > 0


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text, source)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


class TestCollocations:
    def test_planted_collocation_outranks_independents(
        self, ray_session, tmp_path
    ):
        # "new york" always adjacent; "the" co-occurs with everything
        docs = ["new york " + "the cat " * 3] * 5
        sf = _write_docs(tmp_path, [(i, t, "s") for i, t in enumerate(docs)])
        df = q.QUERIES["collocations"](sf).to_pandas().set_index(["w1", "w2"])
        assert df.loc[("new", "york"), "c_ab"] == 5
        assert (
            df.loc[("new", "york"), "lift"] > df.loc[("the", "cat"), "lift"]
        )

    def test_min_count_threshold(self, ray_session, tmp_path):
        sf = _write_docs(tmp_path, [(0, "rare pair", "s"),
                                    (1, "aa bb " * 10, "s")])
        df = q.QUERIES["collocations"](sf).to_pandas()
        pairs = set(zip(df["w1"], df["w2"]))
        assert ("rare", "pair") not in pairs  # c_ab=1 < threshold
        assert ("aa", "bb") in pairs


class TestPostingGaps:
    def test_gaps_reconstruct_postings(self, ray_session):
        df = q.QUERIES["posting_gaps"](SF).to_pandas()
        for term, g in list(df.groupby("term"))[:20]:
            g = g.sort_values("idx")
            assert (g["idx"].values == range(1, len(g) + 1)).all()
            assert (g["gap"].cumsum().values == g["doc_id"].values).all()
            assert (g["gap"].iloc[1:] > 0).all()  # strictly sorted ids

    def test_distinct_per_doc(self, ray_session, tmp_path):
        sf = _write_docs(tmp_path, [(7, "x x x y", "s"), (9, "x", "s")])
        df = q.QUERIES["posting_gaps"](sf).to_pandas().set_index(
            ["term", "idx"]
        )
        assert df.loc[("x", 1), "doc_id"] == 7
        assert df.loc[("x", 1), "gap"] == 7
        assert df.loc[("x", 2), "doc_id"] == 9
        assert df.loc[("x", 2), "gap"] == 2
        assert len(df.loc["y"]) == 1


class TestQuantilesByDomain:
    def test_exact_order_statistics(self, ray_session, tmp_path):
        # source "a": lengths 1..10 -> p50 = v[(10-1)//2]=v[4]=5,
        # p90 = v[(9*9)//10]=v[8]=9
        rows = [(i, "x" * (i + 1), "a") for i in range(10)]
        rows += [(100, "x" * 3, "b")]
        sf = _write_docs(tmp_path, rows)
        df = (
            q.QUERIES["quantiles_by_domain"](sf)
            .to_pandas()
            .set_index("source")
        )
        assert df.loc["a", "n_docs"] == 10
        assert df.loc["a", "p50_chars"] == 5
        assert df.loc["a", "p90_chars"] == 9
        assert df.loc["b", "p50_chars"] == 3
        assert df.loc["b", "p90_chars"] == 3


class TestUrlHistory:
    def test_capture_and_revision_counts(self, ray_session):
        df = q.QUERIES["url_history"](SF).to_pandas().set_index("url")
        assert len(df) == 150
        # fixture: url i has 1 + (i % 3) captures
        d2 = df.loc["https://crawl2.example/doc2"]
        assert d2["n_captures"] == 3
        assert d2["n_revisions"] >= 1
        assert (df["first_ts"] <= df["last_ts"]).all()
        one = df[df["n_captures"] == 1]
        assert (one["churn_ppm"] == 0).all()
        assert (df["n_revisions"] <= df["n_captures"]).all()


class TestDegreeDistribution:
    def test_histogram_masses_match_page_count(self, ray_session):
        df = q.QUERIES["degree_distribution"](SF).to_pandas()
        assert df["n_pages"].sum() == q.LINK_N
        # v3: every page has >= 2 arithmetic + possible hub/nav links
        assert (df["out_degree"] >= 2).all()


class TestTopDocsPerSource:
    def test_top3_with_deterministic_ties(self, ray_session, tmp_path):
        rows = [(1, "aaaa", "s"), (2, "aaaa", "s"), (3, "aaaa", "s"),
                (4, "aaaa", "s"), (5, "bbbbbb", "s"), (6, "c", "t")]
        sf = _write_docs(tmp_path, rows)
        df = (
            q.QUERIES["top_docs_per_source"](sf)
            .to_pandas()
            .sort_values(["source", "rank"])
            .reset_index(drop=True)
        )
        s = df[df["source"] == "s"]
        assert s["doc_id"].tolist() == [5, 1, 2]  # longest, then min ids
        assert s["rank"].tolist() == [1, 2, 3]
        assert df[df["source"] == "t"]["doc_id"].tolist() == [6]

    def test_partial_topk_preprune_is_lossless(self, ray_session):
        got = (
            q.QUERIES["top_docs_per_source"](SF)
            .to_pandas()
            .sort_values(["source", "rank"])
            .reset_index(drop=True)
        )
        import pandas as pd_
        docs = pd_.read_parquet(SF + "/documents.parquet",
                                columns=["doc_id", "source", "n_chars"])
        want = (
            docs.sort_values(["source", "n_chars", "doc_id"],
                             ascending=[True, False, True])
            .groupby("source")
            .head(q.TOP_DOCS_PER_SOURCE)
        )
        assert len(got) == len(want)
        got_ids = got.groupby("source")["doc_id"].apply(set)
        want_ids = want.groupby("source")["doc_id"].apply(set)
        assert got_ids.to_dict() == want_ids.to_dict()


class TestDedupEval:
    def test_perfect_on_fixture_and_consistent(self, ray_session):
        df = q.QUERIES["dedup_eval_lsh"](SF).to_pandas().iloc[0]
        assert df["tp"] <= min(df["n_pred"], df["n_true"])
        if df["n_pred"]:
            assert df["precision_ppm"] == df["tp"] * 1_000_000 // df["n_pred"]
        if df["n_true"]:
            assert df["recall_ppm"] == df["tp"] * 1_000_000 // df["n_true"]

    def test_empty_sample_is_all_zero_row(self, ray_session, tmp_path):
        sf = _write_docs(tmp_path, [(999999937 * k, "unique text %d" % k,
                                     "s") for k in range(1, 4)])
        df = q.QUERIES["dedup_eval_lsh"](sf).to_pandas().iloc[0]
        # whatever sampled in: no near-dups -> tp == n_true == 0
        assert df["n_true"] == 0
        assert df["tp"] == 0
        assert df["recall_ppm"] == 0


class TestCollocationRoutes:
    def test_join_route_matches_broadcast_route(
        self, ray_session, monkeypatch
    ):
        a = (
            q.QUERIES["collocations"](SF)
            .to_pandas()
            .sort_values(["w1", "w2"])
            .reset_index(drop=True)
        )
        monkeypatch.setattr(q.qanalytics, "COLLOC_VOCAB_BROADCAST_LIMIT", 0)
        b = (
            q.QUERIES["collocations"](SF)
            .to_pandas()
            .sort_values(["w1", "w2"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            a, b[a.columns.tolist()], check_exact=True
        )


class TestPivotEvents:
    def test_counts_and_micro_value(self, ray_session, tmp_path):
        t0 = pd.Timestamp("2025-03-01 10:00:00")
        rows = [
            (1, t0, 1, "view", 1.25),
            (2, t0, 1, "view", 0.50),
            (3, t0, 1, "purchase", 10.00),
            (4, t0, 2, "click", 0.0),
        ]
        sf = _write_events(tmp_path, rows)
        df = q.QUERIES["pivot_events"](sf).to_pandas().set_index("user_id")
        assert df.loc[1, "n_view"] == 2
        assert df.loc[1, "n_purchase"] == 1
        assert df.loc[1, "n_click"] == 0
        assert df.loc[1, "value_micro"] == 11_750_000
        assert df.loc[2, "n_click"] == 1


class TestRollup:
    def test_levels_are_consistent(self, ray_session):
        df = q.QUERIES["rollup_source_lang"](SF).to_pandas()
        fine = df[df["lang"].notna()]
        by_src = df[df["lang"].isna() & df["source"].notna()]
        total = df[df["source"].isna()]
        assert len(total) == 1
        assert total["n_docs"].iloc[0] == fine["n_docs"].sum()
        assert total["sum_chars"].iloc[0] == fine["sum_chars"].sum()
        got = by_src.set_index("source")["n_docs"]
        want = fine.groupby("source")["n_docs"].sum()
        assert got.sort_index().equals(want.sort_index())


class TestRunningTotal:
    def test_cumsum_and_seq(self, ray_session, tmp_path):
        t0 = pd.Timestamp("2025-03-01 10:00:00")
        rows = [
            (2, t0 + pd.Timedelta(seconds=5), 1, "view", 2.0),
            (1, t0, 1, "view", 1.5),
            (3, t0 + pd.Timedelta(seconds=9), 1, "view", 0.25),
        ]
        sf = _write_events(tmp_path, rows)
        df = (
            q.QUERIES["running_total"](sf)
            .to_pandas()
            .sort_values("seq")
            .reset_index(drop=True)
        )
        assert df["event_id"].tolist() == [1, 2, 3]
        assert df["cum_value_micro"].tolist() == [
            1_500_000, 3_500_000, 3_750_000]


class TestKeySkew:
    def test_profile_matches_pandas(self, ray_session):
        got = q.QUERIES["key_skew"](SF).to_pandas().iloc[0]
        ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id"])
        vc = ev["user_id"].value_counts()
        top_n = int(vc.max())
        # engine tie-break: max n, then min key
        top_key = int(min(k for k, v in vc.items() if v == top_n))
        assert got["n_rows"] == len(ev)
        assert got["n_keys"] == ev["user_id"].nunique()
        assert got["top_key"] == top_key
        assert got["top_n"] == top_n
        assert got["top_share_ppm"] == top_n * 1_000_000 // len(ev)


class TestAntiJoin:
    def test_orders_without_lineitems(self, ray_session):
        got = q.QUERIES["orders_without_lineitems"](SF).to_pandas()
        orders = pd.read_parquet(SF + "/orders.parquet",
                                 columns=["o_orderkey"])
        items = pd.read_parquet(SF + "/lineitem.parquet",
                                columns=["l_orderkey"])
        want = set(orders["o_orderkey"]) - set(items["l_orderkey"])
        assert set(got["o_orderkey"]) == want
        assert len(got) == len(want) > 0
        assert list(got.columns) == ["o_orderkey", "o_custkey",
                                     "o_totalprice"]


class TestGlobalQuantiles:
    def test_matches_sorted_order_statistics(self, ray_session):
        got = q.QUERIES["global_quantiles"](SF).to_pandas().iloc[0]
        v = (
            pd.read_parquet(SF + "/documents.parquet", columns=["n_chars"])
            ["n_chars"].sort_values().reset_index(drop=True)
        )
        n = len(v)
        assert got["n_docs"] == n
        assert got["p50_chars"] == v[(n - 1) // 2]
        assert got["p90_chars"] == v[((n - 1) * 9) // 10]
        assert got["p99_chars"] == v[((n - 1) * 99) // 100]


class TestHashFeatures:
    def test_bucket_range_and_mass(self, ray_session, tmp_path):
        sf = _write_docs(tmp_path, [(1, "abcd", "s"), (2, "ab", "s")])
        df = q.QUERIES["hash_features"](sf).to_pandas()
        # doc 1: trigrams 'abc','bcd' -> total mass 2; doc 2: none
        assert df[df["doc_id"] == 1]["n"].sum() == 2
        assert (df["doc_id"] == 2).sum() == 0
        assert df["bucket"].between(0, q.HASH_FEATURE_BUCKETS - 1).all()


class TestDau:
    def test_new_plus_returning_consistency(self, ray_session):
        df = (
            q.QUERIES["dau"](SF).to_pandas().sort_values("day")
            .reset_index(drop=True)
        )
        assert (df["n_new"] <= df["n_active"]).all()
        ev = pd.read_parquet(SF + "/events.parquet",
                             columns=["user_id", "ts"])
        # total new across days == number of distinct users ever seen
        assert df["n_new"].sum() == ev["user_id"].nunique()
        # first day: everyone active is new
        assert df.loc[0, "n_new"] == df.loc[0, "n_active"]


class TestCocitation:
    def test_matches_bruteforce(self, ray_session):
        got = (
            q.QUERIES["cocitation"](SF)
            .to_pandas()
            .set_index(["a", "b"])
            .sort_index()
        )
        e = q._outlinks_ds(q.link_corpus()).to_pandas()
        d = e.drop_duplicates()
        deg = d.groupby("src").size()
        from collections import defaultdict

        n_common: dict = defaultdict(int)
        aa: dict = defaultdict(int)
        for src, grp in d.groupby("src"):
            ds_ = sorted(set(grp["dst"]))
            w = 1_000_000 // int(deg[src])
            for i in range(len(ds_)):
                for j in range(i + 1, len(ds_)):
                    n_common[(ds_[i], ds_[j])] += 1
                    aa[(ds_[i], ds_[j])] += w
        want = {k: (v, aa[k]) for k, v in n_common.items()
                if v >= q.COCITE_MIN_COMMON}
        assert len(got) == len(want)
        for k, (n, s) in want.items():
            assert got.loc[k, "n_common"] == n
            assert got.loc[k, "aa_ppm"] == s

    def test_hub_is_most_cocited(self, ray_session):
        got = q.QUERIES["cocitation"](SF).to_pandas()
        hub = "https://site0.example/p0"
        assert ((got["a"] == hub) | (got["b"] == hub)).any()


class TestVocabCoverage:
    def test_consistent_with_top_terms(self, ray_session):
        cov = q.QUERIES["vocab_coverage"](SF).to_pandas().iloc[0]
        top = q.QUERIES["vocab_top_terms"](SF).to_pandas()
        # tiny fixtures can have fewer distinct terms than the cap
        assert cov["vocab_size"] == len(top) <= q.VOCAB_TOP_K
        assert cov["n_in_vocab"] == top["n"].sum()
        assert 0 < cov["coverage_ppm"] <= 1_000_000
        assert (
            cov["coverage_ppm"]
            == cov["n_in_vocab"] * 1_000_000 // cov["n_tokens"]
        )
