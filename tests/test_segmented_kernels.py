"""Property tests for the round-5 whole-partition segmented kernels
(qrelational: bucket_asof / carry / lag / sessionize rewrites).

The sf0.001/sf0.1 oracles pin two corpora; these tests attack the
kernels' edge geometry directly — timestamp TIES between clicks and
events (the strict earlier-ts rule), single-row groups, all-click and
no-click buckets, users spanning many buckets — by comparing the
vectorized partition kernels against brute-force per-group references
written independently from the SQL semantics."""

import numpy as np
import pandas as pd
import pytest

from adaptive_pdf_extractor_ray.pipelines.qrelational import (
    _seg_bounds,
    _seg_last_true_idx,
)


def _mk_events(rng, n_users, n_days, n_rows, tie_rate=0.3):
    """Adversarial event frame: many deliberate ts collisions."""
    users = rng.randint(1, n_users + 1, n_rows)
    days = rng.randint(0, n_days, n_rows)
    base = rng.randint(0, 50, n_rows)  # few distinct ts per bucket -> ties
    ts = (days * 86_400_000_000 + base * 1_000_000).astype("int64")
    if tie_rate:
        dup = rng.rand(n_rows) < tie_rate
        ts[dup] = ts[0]  # extra collisions
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n_rows + 1, dtype="int64"),
            "user_id": users.astype("int64"),
            "day": days.astype("int64"),
            "ts": ts.astype("datetime64[us]"),
            "event_type": np.where(
                rng.rand(n_rows) < 0.4, "click", "view"
            ),
        }
    )


class TestSegHelpers:
    def test_seg_last_true_idx_brute(self):
        rng = np.random.RandomState(0)
        for _ in range(50):
            n = rng.randint(1, 40)
            flag = rng.rand(n) < 0.3
            seg = np.sort(rng.randint(0, 3, n))
            _, starts, lens, grp_start = _seg_bounds(seg)
            got = _seg_last_true_idx(flag, grp_start)
            for i in range(n):
                want = -1
                for j in range(grp_start[i], i + 1):
                    if flag[j]:
                        want = j
                assert got[i] == want, (i, flag.tolist(), seg.tolist())

    def test_seg_bounds(self):
        a = np.array([1, 1, 2, 2, 2, 3])
        b = np.array([0, 0, 0, 1, 1, 1])
        new, starts, lens, gs = _seg_bounds(a, b)
        assert starts.tolist() == [0, 2, 3, 5]
        assert lens.tolist() == [2, 1, 2, 1]
        assert gs.tolist() == [0, 0, 2, 3, 3, 5]


def _brute_asof(df):
    """Reference: per (user, day) bucket, each event's prior click with
    STRICTLY earlier ts (searchsorted side='left' semantics), plus the
    bucket's last click overall."""
    ev_rows, sum_rows = [], []
    for (u, d), g in df.groupby(["user_id", "day"]):
        g = g.sort_values(["ts", "event_id"])
        clicks = g[g["event_type"] == "click"]
        for _, r in g.iterrows():
            earlier = clicks[clicks["ts"] < r["ts"]]
            if len(earlier):
                last = earlier.iloc[-1]
                ev_rows.append((r["event_id"], int(last["event_id"]),
                                last["ts"]))
            else:
                ev_rows.append((r["event_id"], None, None))
        if len(clicks):
            last = clicks.iloc[-1]
            sum_rows.append((u, d, int(last["event_id"]), last["ts"]))
        else:
            sum_rows.append((u, d, None, None))
    return ev_rows, sum_rows


class TestBucketAsofKernel:
    @pytest.mark.parametrize("seed", [1, 2, 3, 4])
    def test_matches_brute_force(self, seed):
        from adaptive_pdf_extractor_ray.pipelines.qrelational import (
            q_asof_join_bucketed,  # noqa: F401  (kernel lives inside)
        )
        # reach the kernel through the public op would need a corpus;
        # instead replicate its call shape: the kernel is defined inside
        # the op, so test through a minimal in-memory copy of the maths
        rng = np.random.RandomState(seed)
        df = _mk_events(rng, n_users=4, n_days=3, n_rows=120)

        # vectorized maths, exactly as bucket_asof_part implements it
        sdf = df.sort_values(
            ["user_id", "day", "ts", "event_id"], kind="mergesort"
        )
        n = len(sdf)
        users = sdf["user_id"].to_numpy(np.int64)
        days = sdf["day"].to_numpy(np.int64)
        ts = sdf["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ids = sdf["event_id"].to_numpy(np.int64)
        is_click = (sdf["event_type"] == "click").to_numpy()
        new_grp, starts, lens, grp_start = _seg_bounds(users, days)
        m = _seg_last_true_idx(is_click, grp_start)
        tsb = new_grp.copy()
        tsb[1:] |= ts[1:] != ts[:-1]
        bstarts = np.flatnonzero(tsb)
        blens = np.diff(np.append(bstarts, n))
        prev_end = np.repeat(bstarts, blens) - 1
        pe = np.clip(prev_end, 0, n - 1)
        prior_idx = np.where(prev_end >= grp_start, m[pe], -1)

        got = {}
        for i in range(n):
            got[ids[i]] = (
                int(ids[prior_idx[i]]) if prior_idx[i] >= 0 else None
            )
        ev_ref, sum_ref = _brute_asof(df)
        for eid, prior, _ in ev_ref:
            assert got[eid] == prior, f"event {eid}"

        gend = starts + lens - 1
        sm = m[gend]
        got_sum = {
            (users[starts[k]], days[starts[k]]):
                (int(ids[sm[k]]) if sm[k] >= starts[k] else None)
            for k in range(len(starts))
        }
        for u, d, last_click, _ in sum_ref:
            assert got_sum[(u, d)] == last_click, f"bucket {(u, d)}"


class TestBucketedOpsVsPlainOnAdversarialCorpus:
    """End-to-end: the bucketed decompositions equal their plain
    forms on a corpus dense with ts ties (written to parquet and run
    through the real operators)."""

    @pytest.fixture(scope="class")
    def sf(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.RandomState(99)
        df = _mk_events(rng, n_users=12, n_days=4, n_rows=3000)
        df["value"] = rng.rand(len(df)).round(4)
        d = tmp_path_factory.mktemp("adv")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(d / "events.parquet"),
        )
        # documents table: _table_rows is probed by some ops
        pq.write_table(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["x"], pa.string())}),
            str(d / "documents.parquet"),
        )
        return str(d)

    @pytest.mark.parametrize("plain,bucketed", [
        ("q_asof_join", "q_asof_join_bucketed"),
        ("q_event_lag", "q_event_lag_bucketed"),
        ("q_sessionize", "q_sessionize_bucketed"),
    ])
    def test_equal(self, ray_session, sf, plain, bucketed):
        from adaptive_pdf_extractor_ray.pipelines import queries as q

        def run(name):
            res = getattr(q, name)(sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        a, b = run(plain), run(bucketed)
        pd.testing.assert_frame_equal(a, b)
