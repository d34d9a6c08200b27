"""Unit tests for the session-7 operators: reservoir sampling,
per-domain dup accounting, funnel, bounded range join, HyperLogLog.
(Oracle value-parity is covered by test_queries_oracle.py / the driver
gate; these pin the semantic edge cases the SQL compare can't isolate.)
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from adaptive_pdf_extractor_ray.pipelines import queries as q
from adaptive_pdf_extractor_ray.stages import sketch as sk

SF = "/root/testdata/sf0.001"


class TestReservoir:
    def test_fixed_size_and_deterministic(self, ray_session):
        a = q.QUERIES["sample_reservoir"](SF).to_pandas()
        b = q.QUERIES["sample_reservoir"](SF).to_pandas()
        assert len(a) == q.RESERVOIR_K
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])

    def test_selection_is_hash_rank_prefix(self, ray_session):
        """The kept set must be exactly the k smallest md5 ranks —
        i.e. a true uniform k-subset under the hash permutation, not a
        per-block approximation."""
        import hashlib

        df = q.QUERIES["sample_reservoir"](SF).to_pandas()
        import pyarrow.parquet as pq

        all_ids = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_pylist()
        ranks = sorted(
            hashlib.md5(str(d).encode()).hexdigest() for d in all_ids
        )
        assert sorted(df["rk"]) == ranks[: q.RESERVOIR_K]


class TestDomainDupStats:
    def test_ratios_in_unit_interval_and_counts_consistent(
        self, ray_session
    ):
        df = q.QUERIES["domain_dup_stats"](SF).to_pandas()
        assert (df["n_unique"] <= df["n_docs"]).all()
        assert ((df["dup_ratio"] >= 0) & (df["dup_ratio"] < 1)).all()
        import pyarrow.parquet as pq

        n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
        assert df["n_docs"].sum() == n


class TestFunnel:
    def test_greedy_chain_is_ordered(self, ray_session):
        df = q.QUERIES["funnel"](SF).to_pandas()
        got = df.dropna(subset=["t_click"])
        assert (got["t_click"] > got["t_view"]).all()
        done = df[df["completed"] == 1]
        assert (done["t_purchase"] > done["t_click"]).all()
        # completed implies all three stamps present
        assert done[["t_view", "t_click", "t_purchase"]].notna().all().all()

    def test_strictness_blocks_equal_timestamps(self, ray_session, tmp_path):
        """A click at exactly the first view's timestamp must NOT count
        (strict '>' at every hop keeps the parse tie-independent)."""
        t0 = pd.Timestamp("2025-01-01 00:00:00")
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array([t0, t0, t0 + pd.Timedelta("1s")]),
                "user_id": pa.array([7, 7, 7], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase"], pa.string()
                ),
                "value": pa.array([0.0, 0.0, 0.0], pa.float64()),
                "props": pa.array(["{}", "{}", "{}"], pa.string()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, tmp_path / "events.parquet")
        df = q.QUERIES["funnel"](str(tmp_path)).to_pandas()
        assert len(df) == 1
        row = df.iloc[0]
        assert row["completed"] == 0
        assert pd.isna(row["t_click"])  # click at t_view is too early


class TestRangeJoin:
    def test_window_boundaries_half_open(self, ray_session, tmp_path):
        """views at exactly ts-300s count; views at exactly ts do not."""
        t0 = pd.Timestamp("2025-01-01 12:00:00")
        rows = [
            # (event_id, ts, type)
            (1, t0 - pd.Timedelta(seconds=300), "view"),   # on lower edge
            (2, t0 - pd.Timedelta(seconds=150), "view"),   # inside
            (3, t0, "view"),                               # at ts: excluded
            (4, t0 - pd.Timedelta(seconds=301), "view"),   # before window
            (5, t0, "click"),                              # the probe
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows]),
                "user_id": pa.array([9] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, tmp_path / "events.parquet")
        df = (
            q.QUERIES["range_join"](str(tmp_path))
            .to_pandas()
            .set_index("event_id")
        )
        assert df.loc[5, "n_views_5m"] == 2  # edge view + inside view


class TestHll:
    def test_error_bound_vs_exact(self, ray_session):
        df = q.QUERIES["approx_distinct_hll"](SF).to_pandas()
        import duckdb

        exact = duckdb.sql(
            f"select count(distinct event_id) from "
            f"read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        est = float(df["est_distinct"].iloc[0])
        # 1.04/sqrt(64) ~ 13%; allow 3 sigma
        assert abs(est - exact) / exact < 3 * 1.04 / math.sqrt(sk.HLL_M)

    def test_merge_law_elementwise_max(self):
        """Registers from split inputs merged by max == registers of the
        union (the property that makes per-block partials exact)."""
        vals = [f"v{i}" for i in range(2000)]
        a = pa.table({"x": pa.array(vals[:1000])})
        b = pa.table({"x": pa.array(vals[1000:])})
        u = pa.table({"x": pa.array(vals)})

        def regs(t):
            p = sk.hll_partial_batch(t, "x")
            return dict(zip(p["j"].to_pylist(), p["rank"].to_pylist()))

        ra, rb, ru = regs(a), regs(b), regs(u)
        merged = dict(ra)
        for j, r in rb.items():
            merged[j] = max(merged.get(j, 0), r)
        assert merged == ru

    def test_small_range_correction_kicks_in(self):
        """A handful of values must route through linear counting
        (E <= 2.5 m with empty registers) and still be near-exact."""
        t = pa.table({"x": pa.array([f"k{i}" for i in range(10)])})
        p = sk.hll_partial_batch(t, "x")
        est = sk.hll_estimate_batch(p)
        v = est["v_zero"][0].as_py()
        assert v > 0
        e = est["est_distinct"][0].as_py()
        expected = sk.HLL_M * math.log(sk.HLL_M / v)
        assert e == round(expected, 6)
        assert abs(e - 10) < 3  # linear counting is near-exact here

    def test_rank_matches_bit_length_definition(self):
        assert sk.hll_rank(0) == 55
        assert sk.hll_rank(1) == 54
        assert sk.hll_rank((1 << 53)) == 1
        assert sk.hll_rank((1 << 53) + 12345) == 1


class TestHits:
    def test_distributed_route_bit_equal_to_driver(
        self, ray_session, monkeypatch
    ):
        """The scale path (join+groupby half-steps) must produce the
        exact table the driver route produces — same integer
        fixed-point arithmetic, so equality is bitwise, not approximate."""
        drv = q.QUERIES["hits_rank"](SF).to_pandas()
        monkeypatch.setattr(q.qanalytics, "PR_DRIVER_EDGE_LIMIT", 0)
        dist = q.QUERIES["hits_rank"](SF).to_pandas()
        a = drv.sort_values("url").reset_index(drop=True)
        b = dist.sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_exact=True)

    def test_scores_in_unit_range_and_informative(self, ray_session):
        df = q.QUERIES["hits_rank"](SF).to_pandas()
        assert ((df["authority"] >= 0) & (df["authority"] <= 1)).all()
        assert ((df["hub"] >= 0) & (df["hub"] <= 1)).all()
        # the ceil-divide rescale (v // ceil(max/S)) keeps the max in
        # (0.5, 1.0] — it cannot decay toward zero across iterations
        assert df["authority"].max() > 0.5
        assert df["hub"].max() > 0.5
        # not a constant vector
        assert df["authority"].nunique() > 10


class TestRangeJoinBucketed:
    def test_identical_to_plain_operator(self, ray_session):
        a = (
            q.QUERIES["range_join"](SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        b = (
            q.QUERIES["range_join_bucketed"](SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b, check_exact=True)

    def test_cross_midnight_window_resolved_by_replication(
        self, ray_session, tmp_path
    ):
        """A click 10 s after midnight must see the views from the last
        minutes of the previous day — the case the per-bucket count
        would miss without the boundary-view replication."""
        mid = pd.Timestamp("2025-03-02 00:00:00")
        rows = [
            (1, mid - pd.Timedelta(seconds=200), "view"),   # prev day, in window
            (2, mid - pd.Timedelta(seconds=400), "view"),   # prev day, too old
            (3, mid + pd.Timedelta(seconds=10), "click"),   # probe, next day
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows]),
                "user_id": pa.array([3] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, tmp_path / "events.parquet")
        df = (
            q.QUERIES["range_join_bucketed"](str(tmp_path))
            .to_pandas()
            .set_index("event_id")
        )
        assert df.loc[3, "n_views_5m"] == 1
        # and the replicated context row is not double-reported
        assert len(df) == 3
