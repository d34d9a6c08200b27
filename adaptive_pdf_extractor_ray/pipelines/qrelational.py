"""Relational coverage: aggregates, joins (broadcast/bucketed/salted/outer), sort, distinct, windows.

Split from the former monolithic queries.py (round-4 VERDICT item 2); the
public surface is re-exported unchanged by pipelines/queries.py.
"""

from __future__ import annotations
import hashlib
import json
import functools
import math
import os
import re
from collections import Counter
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ..functions.rules import Rule
from ..functions.textnorm import normalize_sql, normalize_text_array
from ..stages import dedup as dd
from ..stages import joins as sj
from ..stages import similarity as sim
from ..stages import text as tx
from ..stages.media import MediaDecoder

from .qhelpers import (  # noqa: F401
    BROADCAST_MAX_ROWS, DAY_US, _apool, _pq,
    _read, _table_rows,
)



def q_join_revenue(sf_dir: str):
    """orders ⋈ customer, size-routed: broadcast lookup (J1 pattern) while
    customer fits the broadcast budget, hash-partitioned ``Dataset.join``
    beyond it — same result either way (asserted by the shared oracle)."""
    import pyarrow.parquet as pq_

    n_small = pq_.ParquetFile(_pq(sf_dir, "customer")).metadata.num_rows
    if n_small > BROADCAST_MAX_ROWS:
        # raw Dataset.join is intentional here (not safe_join): both
        # inputs are clean parquet reads — typed blocks, no degenerate
        # hazard — and this branch exists to showcase the native
        # hash-partitioned join against the broadcast route's oracle
        joined = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).join(
            _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
            join_type="inner",
            num_partitions=dd.adaptive_partitions(_table_rows(sf_dir, "orders")),
            on=("o_custkey",), right_on=("c_custkey",),
        )
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
        cref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

        class Join:
            def __init__(self, ref):
                self.seg = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                segs = [self.seg.get(k) for k in t["o_custkey"].to_pylist()]
                return pa.table(
                    {
                        "c_mktsegment": pa.array(segs, pa.string()),
                        "o_totalprice": t["o_totalprice"],
                    }
                )

        joined = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            Join, fn_constructor_args=(cref,),
            batch_format="pyarrow", concurrency=_apool(),
        )

    agg = joined.groupby("c_mktsegment").aggregate(
        ray.data.aggregate.Sum("o_totalprice", alias_name="revenue"),
        ray.data.aggregate.Count(alias_name="n_orders"),
    )
    df = agg.to_pandas()[["c_mktsegment", "revenue", "n_orders"]]
    df["revenue"] = df["revenue"].round(2)
    return df


def q_join_large(sf_dir: str):
    """Both-sides-large join via native hash-partitioned ``Dataset.join``
    (orders ⋈ lineitem on orderkey), then partial+final revenue rollup."""
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    # raw Dataset.join is intentional: both sides are clean parquet
    # reads (typed blocks — the degenerate-block hazard needs a
    # groupby/sort/map_groups upstream), and this op is the native
    # both-sides-large hash-join showcase
    j = od.join(
        li, join_type="inner",
        num_partitions=dd.adaptive_partitions(_table_rows(sf_dir, "lineitem")),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        tt = pa.table({"o_orderpriority": t["o_orderpriority"], "rev": rev})
        import collections

        sums: dict[str, float] = collections.defaultdict(float)
        cnts: dict[str, int] = collections.defaultdict(int)
        for p, r in zip(tt["o_orderpriority"].to_pylist(), tt["rev"].to_pylist()):
            sums[p] += r
            cnts[p] += 1
        return pa.table(
            {
                "o_orderpriority": list(sums.keys()),
                "rev": list(sums.values()),
                "n": pa.array(list(cnts.values()), pa.int64()),
            }
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(
            ray.data.aggregate.Sum("rev", alias_name="revenue"),
            ray.data.aggregate.Sum("n", alias_name="n_lineitems"),
        )
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df


JOIN_BUCKETS = 8


def q_join_bucketed(sf_dir: str):
    """Portable explicit partitioned hash join: bucket both sides on
    ``hash(key) % B``, co-locate with one groupby, pandas-merge inside
    each bucket (the pattern for engines without a native join, and the
    place where hot-key salting would plug in)."""
    import pandas as pd

    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def tag_orders(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"]
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(keys, JOIN_BUCKETS - 1), pa.int64()
                ),
                "key": pc.cast(keys, pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
                "price": pa.nulls(len(t), pa.float64()),
                "disc": pa.nulls(len(t), pa.float64()),
                "side": pa.array(["o"] * len(t), pa.string()),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        keys = t["l_orderkey"]
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(keys, JOIN_BUCKETS - 1), pa.int64()
                ),
                "key": pc.cast(keys, pa.int64()),
                "o_orderpriority": pa.nulls(len(t), pa.string()),
                "price": t["l_extendedprice"],
                "disc": t["l_discount"],
                "side": pa.array(["l"] * len(t), pa.string()),
            }
        )

    both = od.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "o"][["key", "o_orderpriority"]]
        right = g[g["side"] == "l"][["key", "price", "disc"]]
        m = left.merge(right, on="key", how="inner")
        if m.empty:
            return pd.DataFrame({"o_orderpriority": [], "rev": [], "n": []})
        m["rev"] = m["price"] * (1 - m["disc"])
        out = m.groupby("o_orderpriority", as_index=False).agg(
            rev=("rev", "sum"), n=("rev", "size")
        )
        return out

    agg = (
        both.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(
            ray.data.aggregate.Sum("rev", alias_name="revenue"),
            ray.data.aggregate.Sum("n", alias_name="n_lineitems"),
        )
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df["n_lineitems"] = df["n_lineitems"].astype("int64")
    return df


def q_multihop_join(sf_dir: str):
    """Three-table broadcast chain: customer ⋈ nation ⋈ region — the
    dimension-snowflake lookup composed from two broadcast maps."""
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nref = ray.put(
        {
            int(k): (n, int(r))
            for k, n, r in zip(nat["n_nationkey"], nat["n_name"], nat["n_regionkey"])
        }
    )
    rref = ray.put(dict(zip((int(k) for k in reg["r_regionkey"]), reg["r_name"])))

    class Lookup:
        def __init__(self, nr, rr):
            self.nat = ray.get(nr)
            self.reg = ray.get(rr)

        def __call__(self, t: pa.Table) -> pa.Table:
            regions = []
            for k in t["c_nationkey"].to_pylist():
                n = self.nat.get(int(k))
                regions.append(self.reg.get(n[1]) if n else None)
            return pa.table(
                {
                    "r_name": pa.array(regions, pa.string()),
                    "c_acctbal": t["c_acctbal"],
                }
            )

    agg = (
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(Lookup, fn_constructor_args=(nref, rref),
                     batch_format="pyarrow", concurrency=_apool())
        .groupby("r_name")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_customers"),
            ray.data.aggregate.Sum("c_acctbal", alias_name="total_acctbal"),
        )
    )
    df = agg.to_pandas()
    df["total_acctbal"] = df["total_acctbal"].round(2)
    return df


def q_topk_orders(sf_dir: str):
    """Top-10 orders by price: per-block partial top-10 + tiny final
    reduce — no global sort shuffle for a 10-row answer."""
    from ..stages.topk import dataset_topk

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return dataset_topk(
        ds, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 10
    )


def q_distinct_events(sf_dir: str):
    """Distinct values as a distributed groupby — stays a Dataset (a
    driver-side ``unique()`` would bound the operator to driver memory
    at high cardinality)."""
    return (
        _read(sf_dir, "events", ["event_type"])
        .groupby("event_type").count()
        .select_columns(["event_type"])
    )


def q_approx_distinct(sf_dir: str):
    """Approximate count-distinct of ``event_id`` via a KMV bottom-k
    sketch (``stages/sketch.py``): per-block partials emit each block's
    <=k smallest distinct 60-bit hashes (O(k) memory, <=k rows shuffled
    per block), a groupby("hv") dedupes across blocks, sort+limit keeps
    the global bottom-k, and a single-row reduce computes the estimator.
    Unlike ``q_distinct_events`` (exact, shuffles every distinct value),
    the sketch's shuffle volume is independent of cardinality — the
    10^12-row cardinality tool. Deterministic md5 hashing makes the whole
    path value-verifiable: the oracle replays the identical sketch in
    SQL, so this is an APPROXIMATE operator with an EXACT oracle."""
    from ..stages import sketch as sk

    partials = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda t: sk.kmv_partial_batch(t, "event_id"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    bottom_k = (
        partials.groupby("hv").count()
        .select_columns(["hv"])
        .sort("hv")
        .limit(sk.K_KMV)
    )
    return bottom_k.repartition(1).map_batches(
        sk.kmv_estimate_batch, batch_format="pyarrow", batch_size=None
    )


def q_skew_f2(sf_dir: str):
    """AMS second-moment (F2) sketch over the events user_id column —
    the SELF-JOIN-SIZE / skew estimator (`stages/sketch.py` for the
    estimator math). F2 = sum of count^2 per key is exactly what a
    planner needs to decide "salt this join key or not" before paying
    for the shuffle; the sketch answers it in one streaming pass with
    64 signed counters per block, merged by a 64-row groupby — no
    per-key shuffle. The exact F2 rides along (per-key groupby.count +
    per-block sum-of-squares partials) so the output reports the
    sketch's own relative error; the oracle replays sketch AND exact in
    SQL, estimator bias and all (median-of-means; a bare median would
    sit at chi-squared's 0.455 quantile)."""
    from ..stages import sketch as sk

    ev = _read(sf_dir, "events", ["user_id"])
    sums = (
        ev.map_batches(
            lambda t: sk.ams_partial_batch(t, "user_id"),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("j")
        .aggregate(ray.data.aggregate.Sum("s", alias_name="s"))
    )

    def tag_est(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        return pa.table(
            {"kind": pa.array([0] * t.num_rows, pa.int64()),
             "key": pc.cast(t["j"], pa.int64()),
             "v": pc.cast(t["s"], pa.int64())}
        )

    def sumsq_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        ss = sum(int(c) ** 2 for c in t["count()"].to_pylist())
        return pa.table({"kind": pa.array([1], pa.int64()),
                         "key": pa.array([0], pa.int64()),
                         "v": pa.array([ss], pa.int64())})

    exact_partials = ev.groupby("user_id").count().map_batches(
        sumsq_partial, batch_format="pyarrow"
    )

    def finish(t: pa.Table) -> pa.Table:
        kinds = t["kind"].to_pylist()
        keys = t["key"].to_pylist()
        vs = t["v"].to_pylist()
        s_by_j = {k: v for kd, k, v in zip(kinds, keys, vs) if kd == 0}
        exact = sum(v for kd, v in zip(kinds, vs) if kd == 1)
        est = sk.ams_estimate(s_by_j)
        rel = round(abs(est - exact) / exact, 6) if exact else 0.0
        return pa.table(
            {
                "k": pa.array([sk.AMS_K], pa.int64()),
                "est_f2": pa.array([round(est, 6)], pa.float64()),
                "exact_f2": pa.array([exact], pa.int64()),
                "rel_err": pa.array([rel], pa.float64()),
            }
        )

    return (
        sums.map_batches(tag_est, batch_format="pyarrow")
        .union(exact_partials)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


HH_DENOM = 32  # heavy-hitter threshold = ceil(total_tokens / HH_DENOM)


def q_heavy_hitters(sf_dir: str):
    """Count-Min-Sketch heavy hitters over the documents vocabulary —
    the bounded-memory count companion to the KMV cardinality sketch.
    Per-block partials fold local word counts into sparse sketch cells
    (<= depth*width rows shuffled per block REGARDLESS of block size or
    vocabulary), one bounded groupby merges cells elementwise (the CMS
    merge law), the driver assembles the ~64 KiB grid (sketch-sized by
    construction — not an O(data) pull) and broadcasts it to a point-
    query pass over the distinct words. Total tokens T is read off the
    sketch itself (any row sums to T exactly); threshold =
    ceil(T/{HH_DENOM}). Deterministic md5 cells make this an APPROXIMATE
    operator with an EXACT oracle (same contract as
    ``approx_distinct_kmv`` / ``bloom_dedup``): the oracle replays the
    identical grid in SQL, so estimates — overestimates included —
    match to the integer."""
    from ..stages import sketch as sk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cells = (
        docs.map_batches(
            sk.cms_partial_batch, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["j", "pos"])
        .sum("v")
        .take_all()
    )
    flat = [0] * (sk.CMS_DEPTH * sk.CMS_WIDTH)
    for r in cells:
        flat[r["j"] * sk.CMS_WIDTH + r["pos"]] = r["sum(v)"]
    total = sum(flat[: sk.CMS_WIDTH])
    thresh = (total + HH_DENOM - 1) // HH_DENOM
    words = (
        docs.map_batches(
            tx.word_count_partials, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("word")
        .count()
    )
    return words.map_batches(
        sk.CmsEstimate,
        fn_constructor_args=(flat, thresh),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


def q_asof_join(sf_dir: str):
    """As-of join (event attribution): for every event, the most recent
    STRICTLY earlier 'click' by the same user, plus the gap in seconds.
    Ray Data has no native as-of join; the shape is
    ``groupby(key).map_groups`` with a vectorized ``searchsorted`` merge
    inside the group — the partitioning assumption (one key's history
    fits a group) is the same as sessionize and is the documented
    contract. Oracle: DuckDB ``ASOF LEFT JOIN``."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def asof(g: pa.Table) -> pa.Table:
        # (ts, event_id) sort: with duplicate timestamps per user the
        # chosen prior click is deterministic (max event_id among the
        # latest strictly-earlier clicks) — matching the bucketed variant
        # and the oracle's explicit tie-break ordering
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        ts = g["ts"].to_pandas().values  # datetime64[ns], sorted
        ids = np.asarray(g["event_id"].to_pylist(), dtype=np.int64)
        is_click = np.asarray(
            [t == "click" for t in g["event_type"].to_pylist()], dtype=bool
        )
        r_ts, r_id = ts[is_click], ids[is_click]
        idx = np.searchsorted(r_ts, ts, side="left") - 1  # last click < ts
        valid = idx >= 0
        prior = [int(r_id[i]) if ok else None for i, ok in zip(idx, valid)]
        gaps = [
            round(float((t - r_ts[i]) / np.timedelta64(1, "s")), 6) if ok else None
            for t, i, ok in zip(ts, idx, valid)
        ]
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "prior_click_id": pa.array(prior, pa.int64()),
                "gap_s": pa.array(gaps, pa.float64()),
            }
        )

    return ds.groupby("user_id").map_groups(asof, batch_format="pyarrow")
HOUR_US = 3_600_000_000


def _append_epoch_day(t: pa.Table) -> pa.Table:
    """int64 epoch-day shuffle key (column ``day``): a timestamp key
    trips Ray's sort-boundary sampling into per-worker precision-warning
    logs and shuffles wider than an int64 — every bucketed operator
    keys on this instead. Internal only; never an output column."""
    day = pc.divide(
        pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64()),
        pa.scalar(DAY_US, pa.int64()),
    )
    return t.append_column("day", day)


_ASOF_MIXED_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("day", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("prior_click_id", pa.int64()),
        ("prior_ts", pa.timestamp("us")),
    ]
)
_ASOF_CARRY_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("day", pa.int64()),
        ("carry_id", pa.int64()),
        ("carry_ts", pa.timestamp("us")),
    ]
)


def _salted_map_groups(ds, keys, fn, schema, *, parts: int | None = None,
                       whole_partition: bool = False):
    """``groupby(keys).map_groups(fn)`` with the per-group dispatch
    moved out of Ray and into pandas inside salt partitions.

    Ray's map_groups costs milliseconds of machinery PER GROUP; the
    bucketed ops' (user, day) key spaces (tens of thousands of tiny
    groups, several map_groups phases each) made them the three slowest
    rows of the round-5 sf0.1 gate (asof_join_bucketed 133 s). One salt
    shuffle + pandas ``groupby`` iteration inside each partition runs
    the same per-group python at microseconds per group: 133 s -> ~2 s.
    Salt is a deterministic integer mix of the key columns, so a key's
    rows always co-locate — the decomposition stays exact. ``fn`` may
    return a pa.Table or a pandas DataFrame; every partition's output
    is cast to ``schema``, which also pins empty partitions."""
    import pandas as pd

    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    parts = parts or max(8, n_cpu * 2)

    def salt(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), np.uint64)
        for k in keys:
            h = h * np.uint64(1000003) + t[k].to_numpy(
                zero_copy_only=False
            ).astype(np.uint64)
        return t.append_column(
            "_p", pa.array((h % np.uint64(parts)).astype(np.int64))
        )

    def run(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["_p"])
        if whole_partition:
            if not len(df):
                return schema.empty_table()
            o = fn(df)
            if isinstance(o, pd.DataFrame):
                o = pa.Table.from_pandas(
                    o, preserve_index=False
                ).replace_schema_metadata(None)
            if not o.num_rows:
                return schema.empty_table()
            return o.select(schema.names).cast(schema)
        outs = []
        for _, g in df.groupby(list(keys), sort=False):
            o = fn(g)
            if isinstance(o, pd.DataFrame):
                o = pa.Table.from_pandas(
                    o, preserve_index=False
                ).replace_schema_metadata(None)
            if o.num_rows:
                outs.append(o.select(schema.names).cast(schema))
        if not outs:
            return schema.empty_table()
        return pa.concat_tables(outs)

    return (
        ds.map_batches(salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_p")
        .map_groups(run, batch_format="pandas")
    )


def _seg_last_true_idx(flag, grp_start):
    """Per row i: the index of the last row at-or-before i WITHIN its
    segment where ``flag`` is True; -1 if none. One global cummax of
    flagged indices masked to the segment start — the vectorized
    building block the bucketed ops' forward scans share."""
    n = len(flag)
    m = np.maximum.accumulate(np.where(flag, np.arange(n), -1))
    return np.where(m >= grp_start, m, -1)


def _seg_bounds(*cols):
    """Segment starts / lengths / per-row segment-start for rows sorted
    by the given key columns."""
    n = len(cols[0])
    new = np.zeros(n, bool)
    new[0] = True
    for c in cols:
        new[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, n))
    return new, starts, lens, np.repeat(starts, lens)


def q_asof_join_bucketed(sf_dir: str):
    """asof_join WITHOUT the per-key-history assumption: (user, day)
    buckets resolve each event's prior click within the bucket; a tiny
    per-user carry pass over bucket summaries (latest click of every
    earlier bucket) resolves the events whose prior click is in an older
    bucket, attached back via a hash join on (user, day). Value-verified
    identical to the plain ``asof_join``."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    day_bucket = _append_epoch_day

    def bucket_asof_part(df: "pd.DataFrame") -> pa.Table:
        """WHOLE-PARTITION vectorized form of the per-(user, day) asof
        scan: one sort, segmented cummax of click indices, the strict
        earlier-ts rule via previous-ts-block ends — no per-group
        pandas (which cost ~2.5 ms x 40k groups = the slowest row of
        the round-5 sf0.1 gate before this rewrite)."""
        df = df.sort_values(
            ["user_id", "day", "ts", "event_id"], kind="mergesort"
        )
        n = len(df)
        users = df["user_id"].to_numpy(np.int64)
        days = df["day"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ids = df["event_id"].to_numpy(np.int64)
        is_click = (df["event_type"] == "click").to_numpy()
        new_grp, starts, lens, grp_start = _seg_bounds(users, days)
        m = _seg_last_true_idx(is_click, grp_start)
        # strict earlier-ts prior: evaluate the click cummax at the END
        # of the PREVIOUS (group, ts) block, so same-ts clicks never
        # resolve (searchsorted side="left" parity)
        tsb = new_grp.copy()
        tsb[1:] |= ts[1:] != ts[:-1]
        bstarts = np.flatnonzero(tsb)
        blens = np.diff(np.append(bstarts, n))
        prev_end = np.repeat(bstarts, blens) - 1
        pe = np.clip(prev_end, 0, n - 1)
        prior_idx = np.where(prev_end >= grp_start, m[pe], -1)
        ok = prior_idx >= 0
        pi = np.clip(prior_idx, 0, n - 1)
        gend = starts + lens - 1
        sm = m[gend]
        s_ok = sm >= starts
        smc = np.clip(sm, 0, n - 1)
        g = len(starts)
        return pa.table(
            {
                "kind": pa.array(["ev"] * n + ["sum"] * g, pa.string()),
                "event_id": pa.array(
                    np.concatenate([ids, np.full(g, -1, np.int64)]),
                    pa.int64(),
                ),
                "user_id": pa.array(
                    np.concatenate([users, users[starts]]), pa.int64()
                ),
                "day": pa.array(
                    np.concatenate([days, days[starts]]), pa.int64()
                ),
                "ts": pa.array(
                    np.concatenate([ts, np.zeros(g, np.int64)]).astype(
                        "datetime64[us]"
                    ),
                    mask=np.concatenate([np.zeros(n, bool),
                                         np.ones(g, bool)]),
                ),
                "prior_click_id": pa.array(
                    np.concatenate([ids[pi], ids[smc]]),
                    pa.int64(),
                    mask=~np.concatenate([ok, s_ok]),
                ),
                "prior_ts": pa.array(
                    np.concatenate([ts[pi], ts[smc]]).astype(
                        "datetime64[us]"
                    ),
                    mask=~np.concatenate([ok, s_ok]),
                ),
            }
        )

    def carry_part(df: "pd.DataFrame") -> pa.Table:
        """Per user, vectorized across the partition: for each bucket,
        the latest click of every EARLIER bucket (shift(1).ffill of the
        day-sorted summaries = cummax of non-null indices evaluated at
        the previous row)."""
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        n = len(df)
        users = df["user_id"].to_numpy(np.int64)
        days = df["day"].to_numpy(np.int64)
        has = df["prior_click_id"].notna().to_numpy()
        pid = df["prior_click_id"].fillna(0).to_numpy(np.int64)
        pts = df["prior_ts"].to_numpy("datetime64[us]").astype(np.int64)
        _, _, _, ustart = _seg_bounds(users)
        m = _seg_last_true_idx(has, ustart)
        prev = np.arange(n) - 1
        pv = np.clip(prev, 0, n - 1)
        mprev = np.where(prev >= ustart, m[pv], -1)
        ok = mprev >= 0
        mp = np.clip(mprev, 0, n - 1)
        return pa.table(
            {
                "user_id": pa.array(users[ok], pa.int64()),
                "day": pa.array(days[ok], pa.int64()),
                "carry_id": pa.array(pid[mp][ok], pa.int64()),
                "carry_ts": pa.array(
                    pts[mp][ok].astype("datetime64[us]")
                ),
            }
        )

    mixed = _salted_map_groups(
        ds.map_batches(day_bucket, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "day"], bucket_asof_part, _ASOF_MIXED_SCHEMA,
        whole_partition=True,
    ).materialize()  # consumed by three downstream branches

    def finish_resolved(t: pa.Table) -> pa.Table:
        a = pc.cast(t["ts"], pa.timestamp("us"))
        b = pc.cast(t["prior_ts"], pa.timestamp("us"))
        gap = pc.round(
            pc.divide(pc.cast(pc.subtract(a, b), pa.int64()), 1_000_000.0),
            ndigits=6,
        )
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "prior_click_id": pc.cast(t["prior_click_id"], pa.int64()),
                "gap_s": pc.cast(gap, pa.float64()),
            }
        )

    def _f_resolved(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.equal(t["kind"], "ev"),
                                pc.is_valid(t["prior_click_id"])))

    resolved = mixed.map_batches(
        _f_resolved, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(finish_resolved, batch_format="pyarrow")

    carries = _salted_map_groups(
        mixed.filter(expr="kind == 'sum'"),
        ["user_id"], carry_part, _ASOF_CARRY_SCHEMA,
        whole_partition=True,
    )
    def _f_unresolved(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.equal(t["kind"], "ev"),
                                pc.is_null(t["prior_click_id"])))

    unresolved = mixed.map_batches(
        _f_unresolved, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["event_id", "user_id", "day", "ts"])

    # attach carries to unresolved events via an explicit bucketed merge
    # (union tagged rows -> groupby (user, day) -> in-group fill): the
    # same co-location as a hash join, but robust to runtime-only
    # schemas / empty key partitions, with every group output pinned to
    # one explicit arrow schema
    def tag_unresolved(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mkind": pa.array(["ev2"] * len(t), pa.string()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "day": pc.cast(t["day"], pa.int64()),
                "ts": pc.cast(t["ts"], pa.timestamp("us")),
                "carry_id": pa.nulls(len(t), pa.int64()),
                "carry_ts": pa.nulls(len(t), pa.timestamp("us")),
            }
        )

    def tag_carry(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mkind": pa.array(["carry"] * len(t), pa.string()),
                "event_id": pa.nulls(len(t), pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "day": pc.cast(t["day"], pa.int64()),
                "ts": pa.nulls(len(t), pa.timestamp("us")),
                "carry_id": pc.cast(t["carry_id"], pa.int64()),
                "carry_ts": pc.cast(t["carry_ts"], pa.timestamp("us")),
            }
        )

    def fill_part(df: "pd.DataFrame") -> pa.Table:
        """Vectorized (user, day) carry attach: one pandas C-merge per
        partition instead of a python pass per bucket."""
        ev = df[df["mkind"] == "ev2"][
            ["event_id", "user_id", "day", "ts"]
        ]
        cr = df[df["mkind"] == "carry"][
            ["user_id", "day", "carry_id", "carry_ts"]
        ]
        m = ev.merge(cr, on=["user_id", "day"], how="left")
        gaps = (
            (m["ts"] - m["carry_ts"]).dt.total_seconds().round(6)
        )
        return pa.table(
            {
                "event_id": pa.array(
                    m["event_id"].to_numpy(np.int64), pa.int64()
                ),
                "prior_click_id": pa.Array.from_pandas(
                    m["carry_id"], type=pa.int64()
                ),
                "gap_s": pa.Array.from_pandas(gaps, type=pa.float64()),
            }
        )

    tagged = unresolved.map_batches(
        tag_unresolved, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        carries.map_batches(tag_carry, batch_format="pyarrow",
                            zero_copy_batch=True)
    )
    fill_schema = pa.schema(
        [("event_id", pa.int64()), ("prior_click_id", pa.int64()),
         ("gap_s", pa.float64())]
    )
    filled = _salted_map_groups(
        tagged, ["user_id", "day"], fill_part, fill_schema,
        whole_partition=True,
    )
    return resolved.union(filled)


def q_window_hourly(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def pre(t: pa.Table) -> pa.Table:
        # int64 epoch-hour shuffle key; back to timestamp after the agg
        hour = pc.divide(
            pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64()),
            pa.scalar(HOUR_US, pa.int64()),
        )
        return pa.table(
            {"event_type": t["event_type"], "hour": hour, "value": t["value"]}
        )

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(
            ray.data.aggregate.Count(alias_name="n"),
            ray.data.aggregate.Sum("value", alias_name="sum_value"),
        )
    )
    import pandas as pd

    df = agg.to_pandas()
    df["hour"] = pd.to_datetime(df["hour"] * 3600, unit="s")
    df["sum_value"] = df["sum_value"].round(2)
    return df


def q_sliding_window(sf_dir: str):
    """Sliding windowed aggregate (2h window, 1h step) per event_type,
    composed from tumbling hourly partials — the compose-from-partials
    pattern for windows Ray Data lacks natively."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def pre(t: pa.Table) -> pa.Table:
        # int64 epoch-hour shuffle key; back to timestamp after the agg
        hour = pc.divide(
            pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64()),
            pa.scalar(HOUR_US, pa.int64()),
        )
        return pa.table(
            {"event_type": t["event_type"], "hour": hour, "value": t["value"]}
        )

    hourly = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(
            ray.data.aggregate.Count(alias_name="n"),
            ray.data.aggregate.Sum("value", alias_name="sv"),
        )
    )

    def slide(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(hour=pd.to_datetime(g["hour"] * 3600, unit="s"))
        g = g.sort_values("hour").set_index("hour")
        full = g.reindex(
            pd.date_range(g.index.min(), g.index.max(), freq="1h")
        ).fillna({"n": 0, "sv": 0.0})
        out = pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "window_start": full.index,
                "n": (full["n"] + full["n"].shift(-1).fillna(0)).astype("int64"),
                "sum_value": (full["sv"] + full["sv"].shift(-1).fillna(0.0)).round(2),
            }
        )
        return out.reset_index(drop=True)

    return hourly.groupby("event_type").map_groups(slide, batch_format="pandas")


def q_event_lag(sf_dir: str):
    """Per-event as-of/lag: time since the user's previous event — the
    window-function shape via groupby(user).map_groups over ts-sorted
    events (pd.merge_asof machinery)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        td = g["ts"] - g["ts"].shift(1)
        # exact integer microseconds: no float-rounding ambiguity vs SQL
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "gap_us": td / pd.Timedelta(microseconds=1),
            }
        ).dropna()  # a user's first event has no predecessor
        out["gap_us"] = out["gap_us"].astype("int64")
        return out

    return ds.groupby("user_id").map_groups(lag, batch_format="pandas")


def q_event_lag_bucketed(sf_dir: str):
    """event_lag WITHOUT the per-key-history assumption: (user, day)
    buckets compute within-bucket gaps + one boundary-summary row
    (first/last ts, first event id); a tiny per-user pass over the
    summaries emits the cross-boundary gaps. Union == the plain
    operator's per-event output exactly (same oracle)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    day_bucket = _append_epoch_day

    def bucket_lag_part(df: "pd.DataFrame") -> pa.Table:
        """Whole-partition vectorized per-(user, day) gaps + one
        boundary-summary row per bucket (the 89 s -> ~3 s rewrite,
        same recipe as bucket_asof_part)."""
        df = df.sort_values(
            ["user_id", "day", "ts", "event_id"], kind="mergesort"
        )
        n = len(df)
        users = df["user_id"].to_numpy(np.int64)
        days = df["day"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ids = df["event_id"].to_numpy(np.int64)
        new_grp, starts, lens, _ = _seg_bounds(users, days)
        gap = np.empty(n, np.float64)
        gap[0] = np.nan
        gap[1:] = (ts[1:] - ts[:-1]).astype(np.float64)
        gap[new_grp] = np.nan
        keep = ~new_grp
        g = len(starts)
        gend = starts + lens - 1
        nk = int(keep.sum())
        return pa.table(
            {
                "event_id": pa.array(
                    np.concatenate([ids[keep], ids[starts]]), pa.int64()
                ),
                "gap_us": pa.array(
                    np.concatenate([gap[keep], np.full(g, np.nan)]),
                    pa.float64(),
                    mask=np.concatenate(
                        [np.zeros(nk, bool), np.ones(g, bool)]
                    ),
                ),
                "kind": pa.array(
                    ["gap"] * nk + ["summary"] * g, pa.string()
                ),
                "user_id": pa.array(
                    np.concatenate([users[keep], users[starts]]),
                    pa.int64(),
                ),
                "first_ts": pa.array(
                    np.concatenate(
                        [np.zeros(nk, np.int64), ts[starts]]
                    ).astype("datetime64[us]"),
                    mask=np.concatenate(
                        [np.ones(nk, bool), np.zeros(g, bool)]
                    ),
                ),
                "last_ts": pa.array(
                    np.concatenate(
                        [np.zeros(nk, np.int64), ts[gend]]
                    ).astype("datetime64[us]"),
                    mask=np.concatenate(
                        [np.ones(nk, bool), np.zeros(g, bool)]
                    ),
                ),
            }
        )

    def stitch_part(df: "pd.DataFrame") -> pa.Table:
        df = df.sort_values(["user_id", "first_ts"], kind="mergesort")
        n = len(df)
        users = df["user_id"].to_numpy(np.int64)
        ids = df["event_id"].to_numpy(np.int64)
        fts = df["first_ts"].to_numpy("datetime64[us]").astype(np.int64)
        lts = df["last_ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_u = np.zeros(n, bool)
        new_u[0] = True
        new_u[1:] = users[1:] != users[:-1]
        gap = np.empty(n, np.int64)
        gap[0] = 0
        gap[1:] = fts[1:] - lts[:-1]
        keep = ~new_u
        return pa.table(
            {
                "event_id": pa.array(ids[keep], pa.int64()),
                "gap_us": pa.array(gap[keep], pa.int64()),
            }
        )

    lag_schema = pa.schema(
        [("event_id", pa.int64()), ("gap_us", pa.float64()),
         ("kind", pa.string()), ("user_id", pa.int64()),
         ("first_ts", pa.timestamp("us")), ("last_ts", pa.timestamp("us"))]
    )
    mixed = _salted_map_groups(
        ds.map_batches(day_bucket, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "day"], bucket_lag_part, lag_schema,
        whole_partition=True,
    ).materialize()  # consumed by the gap and boundary branches

    def finish_gaps(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "gap_us": pc.cast(t["gap_us"], pa.int64()),
            }
        )

    gaps = mixed.filter(expr="kind == 'gap'").map_batches(
        finish_gaps, batch_format="pyarrow"
    )
    boundary = _salted_map_groups(
        mixed.filter(expr="kind == 'summary'"),
        ["user_id"], stitch_part,
        pa.schema([("event_id", pa.int64()), ("gap_us", pa.int64())]),
        whole_partition=True,
    )
    return gaps.union(boundary)


SESSION_GAP_S = 1800


def q_sessionize(sf_dir: str):
    """Session windows per user (gap > 30 min starts a new session) —
    groupby(user).map_groups over ts-sorted events (streaming-shaped op)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sessions(g) -> "pa.Table":
        import pandas as pd

        g = g.sort_values("ts")
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0)
        n_sessions = int((gaps > SESSION_GAP_S).sum()) + 1
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(g)],
                "n_sessions": [n_sessions],
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def q_sessionize_bucketed(sf_dir: str):
    """Sessionize WITHOUT the per-key-history-fits-a-group assumption:
    partition by (user, day) — bounded groups however long a user's
    history grows — compute per-bucket session counts plus boundary
    timestamps, then stitch adjacent buckets whose boundary gap is
    within the session window (a second, tiny groupby over one row per
    (user, day)). Value-verified equal to the plain ``sessionize``
    (same oracle SQL), proving the decomposition is exact."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    day_bucket = _append_epoch_day

    def bucket_summary_part(df) -> "pa.Table":
        """Whole-partition vectorized per-(user, day) session summary
        (27 s -> ~2 s, same recipe as bucket_asof_part)."""
        df = df.sort_values(["user_id", "day", "ts"], kind="mergesort")
        n = len(df)
        users = df["user_id"].to_numpy(np.int64)
        days = df["day"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        new_grp, starts, lens, _ = _seg_bounds(users, days)
        gap_s = np.zeros(n, np.float64)
        gap_s[1:] = (ts[1:] - ts[:-1]) / 1e6
        gap_s[new_grp] = 0.0
        brk = (gap_s > SESSION_GAP_S).astype(np.int64)
        n_sessions = np.add.reduceat(brk, starts) + 1
        gend = starts + lens - 1
        return pa.table(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "day": pa.array(days[starts], pa.int64()),
                "n_events": pa.array(lens.astype(np.int64), pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
                "first_ts": pa.array(
                    ts[starts].astype("datetime64[us]")
                ),
                "last_ts": pa.array(ts[gend].astype("datetime64[us]")),
            }
        )

    def stitch_part(df) -> "pa.Table":
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        n = len(df)
        users = df["user_id"].to_numpy(np.int64)
        fts = df["first_ts"].to_numpy("datetime64[us]").astype(np.int64)
        lts = df["last_ts"].to_numpy("datetime64[us]").astype(np.int64)
        nev = df["n_events"].to_numpy(np.int64)
        nse = df["n_sessions"].to_numpy(np.int64)
        new_u = np.zeros(n, bool)
        new_u[0] = True
        new_u[1:] = users[1:] != users[:-1]
        ustarts = np.flatnonzero(new_u)
        bg = np.zeros(n, np.float64)
        bg[1:] = (fts[1:] - lts[:-1]) / 1e6
        merged = ((bg <= SESSION_GAP_S) & ~new_u).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users[ustarts], pa.int64()),
                "n_events": pa.array(
                    np.add.reduceat(nev, ustarts), pa.int64()
                ),
                "n_sessions": pa.array(
                    np.add.reduceat(nse, ustarts)
                    - np.add.reduceat(merged, ustarts),
                    pa.int64(),
                ),
            }
        )

    buckets = _salted_map_groups(
        ds.map_batches(day_bucket, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "day"], bucket_summary_part,
        pa.schema(
            [("user_id", pa.int64()), ("day", pa.int64()),
             ("n_events", pa.int64()), ("n_sessions", pa.int64()),
             ("first_ts", pa.timestamp("us")),
             ("last_ts", pa.timestamp("us"))]
        ),
        whole_partition=True,
    )
    return _salted_map_groups(
        buckets, ["user_id"], stitch_part,
        pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                   ("n_sessions", pa.int64())]),
        whole_partition=True,
    )




def q_media_meta(sf_dir: str):
    """Binary media column plumbing: payload -> actor-pool decode (fake,
    deterministic) -> typed metadata. Non-SQL (blake2b): rows-only check."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(
                    [(s or "").encode("utf-8") for s in t["text"].to_pylist()],
                    pa.binary(),
                ),
            }
        )

    return (
        docs.map_batches(to_payload, batch_format="pyarrow")
        .map_batches(
            MediaDecoder,
            # force_fake: the oracle replicates the md5-derived decode in
            # SQL, which must hold even in environments where PIL exists
            fn_constructor_kwargs={"payload_col": "payload",
                                   "force_fake": True},
            batch_format="pyarrow", batch_size=128, concurrency=_apool(),
        )
        .select_columns(["doc_id", "width", "height", "format", "n_bytes"])
    )
