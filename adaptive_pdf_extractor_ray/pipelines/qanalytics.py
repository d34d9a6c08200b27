"""Session-7 analytics: reservoir/stratified sampling, funnels, range joins, sketches, link analytics.

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
    DAY_US, _apool, _pq, _read,
    _table_rows,
)
from .qdedup import (  # noqa: F401
    _distinct_pairs, _grouped_count, _lsh_candidate_pairs, _lsh_distinct_pairs,
    q_dedup_minhash_clusters, q_setsim_join, q_syndication_pairs,
)
from .qsimilarity import (  # noqa: F401
    q_knn_brute, q_knn_lsh,
)
from .qrelational import (  # noqa: F401
    SESSION_GAP_S,
)
from .qmedia import (  # noqa: F401
    VOCAB_TOP_K,
)
from .qquality import (  # noqa: F401
    LINK_N,
)
from .qgraph import (  # noqa: F401
    PR_DRIVER_EDGE_LIMIT, _grouped_sum_str, _outlinks_ds, _und_edges_ds,
    link_corpus, recrawl_corpus,
)
from .qcuration import (  # noqa: F401
    SPLIT_BUCKETS, SPLIT_TRAIN,
)
from .qtraining import (  # noqa: F401
    SPLIT_VALID,
)
from .qwarc import (  # noqa: F401
    RESERVOIR_K,
)



def q_sample_reservoir(sf_dir: str):
    """Fixed-size-k uniform sample of the corpus — the distributed,
    deterministic equivalent of reservoir sampling: rank every row by a
    content-independent hash (md5 of doc_id) and keep the global k
    smallest. Because the hash is a uniform permutation of the key
    space, the k lowest-ranked rows ARE a uniform k-subset — but unlike
    a classic sequential reservoir the selection is order-free,
    restart-stable and embarrassingly parallel: per-block top-k partials
    + one tiny final reduce (``stages/topk.dataset_topk``), never a
    global sort. Shuffle volume: k rows per block, independent of corpus
    size."""

    def rk(t: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(str(d).encode("utf-8")).hexdigest()
            for d in t["doc_id"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"],
                         "rk": pa.array(keys, pa.string())})

    ranked = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        rk, batch_format="pyarrow", zero_copy_batch=True
    )
    from ..stages.topk import dataset_topk

    return dataset_topk(ranked, [("rk", "ascending")], RESERVOIR_K)


SAMPLE_W_K = 64


def q_sample_weighted(sf_dir: str):
    """Weight-proportional sample WITHOUT replacement — priority sampling
    (Duffield, Lund & Thorup, JACM'07), the weighted analog of the
    hash-rank reservoir above. Each doc gets priority q = w / u with
    weight w = n_chars and u a deterministic md5-derived uniform
    ((hv+1) / 2^60 for the 60-bit hash prefix — the constant 2^60 cancels
    in the ordering, so the key is the single IEEE division
    w / (hv+1)); the k largest priorities are the sample, and with
    threshold tau = the (k+1)-th priority, est_w = max(w, tau) is the
    DLT unbiased per-item weight estimator (sum(est_w) estimates the
    corpus's total weight from k rows).

    Deterministic, order-free and restart-stable like sample_reservoir —
    no RNG state, no sequential scan. Distributed shape: stateless
    priority map -> per-block top-(k+1) partials -> one tiny final
    reduce; shuffle volume is k+1 rows per block regardless of corpus
    size. The oracle replays the identical integer->double arithmetic,
    so the gate verifies both the selection and the estimator."""
    from ..stages.topk import dataset_topk

    def pri(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hv1 = [
            int(hashlib.md5(str(d).encode("utf-8")).hexdigest()[:15], 16) + 1
            for d in ids
        ]
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = w / np.array(hv1, dtype=np.float64)
        return pa.table(
            {"doc_id": t["doc_id"], "n_chars": t["n_chars"],
             "p": pa.array(p, pa.float64())}
        )

    keys = [("p", "descending"), ("doc_id", "ascending")]
    top = dataset_topk(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
            pri, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys, SAMPLE_W_K + 1,
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        tau = t["p"][SAMPLE_W_K].as_py() if t.num_rows > SAMPLE_W_K else 0.0
        keep = t.slice(0, SAMPLE_W_K)
        w = keep["n_chars"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "doc_id": keep["doc_id"],
                "n_chars": keep["n_chars"],
                "pri": pc.round(keep["p"], ndigits=6),
                "est_w": pc.round(
                    pa.array(np.maximum(w, tau), pa.float64()), ndigits=6
                ),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


SAMPLE_WS_K = 3  # per-stratum sample size


def q_sample_weighted_stratified(sf_dir: str):
    """Per-stratum weighted sampling — DLT priority sampling
    (``sample_weighted``) run independently inside every source: k docs
    per source, selection probability ∝ n_chars within the stratum, with
    the per-stratum threshold estimator est_w = max(w, tau_source). The
    balanced-but-weighted curation primitive ("keep the 3 weightiest-
    by-chance docs per domain").

    Same two-level shape as ``top_docs_per_source``: a per-batch partial
    keeps each source's top-(k+1) priorities BEFORE the shuffle, so the
    groupby moves at most (k+1) x sources x blocks rows; the final
    bounded group computes tau from the (k+1)-th priority. Deterministic
    md5 priorities — no RNG state, restart-stable, SQL-replayable."""

    def pri(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hv1 = [
            int(hashlib.md5(str(d).encode("utf-8")).hexdigest()[:15], 16) + 1
            for d in ids
        ]
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = w / np.array(hv1, dtype=np.float64)
        return pa.table(
            {"source": t["source"], "doc_id": t["doc_id"],
             "n_chars": t["n_chars"], "p": pa.array(p, pa.float64())}
        )

    keys = [("source", "ascending"), ("p", "descending"),
            ("doc_id", "ascending")]

    def partial(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        src = t["source"].to_pylist()
        keep, seen, last = [], 0, None
        for i, s in enumerate(src):
            if s != last:
                last, seen = s, 0
            seen += 1
            if seen <= SAMPLE_WS_K + 1:
                keep.append(i)
        return t.take(pa.array(keep, pa.int64()))

    def final(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(
            g, sort_keys=[("p", "descending"), ("doc_id", "ascending")]
        ))
        tau = g["p"][SAMPLE_WS_K].as_py() if g.num_rows > SAMPLE_WS_K else 0.0
        top = g.slice(0, SAMPLE_WS_K)
        w = top["n_chars"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "source": top["source"],
                "doc_id": top["doc_id"],
                "n_chars": top["n_chars"],
                "pri": pc.round(top["p"], ndigits=6),
                "est_w": pc.round(
                    pa.array(np.maximum(w, tau), pa.float64()), ndigits=6
                ),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        .map_batches(pri, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )


def q_domain_dup_stats(sf_dir: str):
    """Per-domain duplication accounting — the crawl-health signal that
    decides which domains to downsample before expensive near-dup
    passes: per (source, md5(text)) copy counts, then a per-source
    rollup to (n_docs, n_unique, dup_ratio). Two shuffles, both keyed
    below document granularity: (source, 16-byte hash) then source —
    text never moves."""

    def h(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5((s or "").encode("utf-8")).hexdigest()
            for s in t["text"].to_pylist()
        ]
        return pa.table({"source": t["source"],
                         "h": pa.array(hs, pa.string())})

    per_text = (
        _read(sf_dir, "documents", ["source", "text"])
        .map_batches(h, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "h"])
        .count()
    )
    agg = per_text.groupby("source").aggregate(
        ray.data.aggregate.Count(alias_name="n_unique"),
        ray.data.aggregate.Sum("count()", alias_name="n_docs"),
    )

    def finish(t: pa.Table) -> pa.Table:
        ratio = pc.round(
            pc.subtract(
                pa.scalar(1.0),
                pc.divide(
                    pc.multiply(pc.cast(t["n_unique"], pa.float64()),
                                pa.scalar(1.0)),
                    pc.cast(t["n_docs"], pa.float64()),
                ),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_unique": pc.cast(t["n_unique"], pa.int64()),
                "dup_ratio": ratio,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_funnel(sf_dir: str):
    """Per-user conversion funnel view -> click -> purchase: the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that (greedy-earliest chain — the unique
    deterministic parse of the funnel). One shuffle on user_id; each
    step is a vectorized min over the sorted group. Strict '>' at every
    hop keeps the result tie-independent when a user has several events
    on one timestamp. Same partitioning contract as sessionize: one
    user's history fits a group."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def funnel(g: pa.Table) -> pa.Table:
        uid = g["user_id"][0].as_py()
        ts = g["ts"].to_pandas().values
        et = g["event_type"].to_pylist()
        kinds = np.asarray(et)
        t1 = t2 = t3 = None
        v = ts[kinds == "view"]
        if len(v):
            t1 = v.min()
            c = ts[(kinds == "click") & (ts > t1)]
            if len(c):
                t2 = c.min()
                p = ts[(kinds == "purchase") & (ts > t2)]
                if len(p):
                    t3 = p.min()
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "t_view": pa.array([t1], pa.timestamp("us")),
                "t_click": pa.array([t2], pa.timestamp("us")),
                "t_purchase": pa.array([t3], pa.timestamp("us")),
                "completed": pa.array(
                    [1 if t3 is not None else 0], pa.int64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(funnel, batch_format="pyarrow")


RANGE_WINDOW_S = 300


def q_range_join(sf_dir: str):
    """Bounded range join (time-window attribution): for every event,
    the number of 'view' events by the same user in the half-open
    window [ts - 300 s, ts). Ray Data has no native range join; the
    shape is groupby(user).map_groups with TWO vectorized searchsorted
    probes per group (window start and end) against the sorted view
    timestamps — O(n log n) per group instead of the oracle's O(n^2)
    self-join. Counting is tie-insensitive, so no secondary sort key is
    needed. Same partitioning contract as asof_join; see
    q_range_join_bucketed for the bounded-window decomposition that
    removes it."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    w = np.timedelta64(RANGE_WINDOW_S, "s")

    def count_views(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        ts = g["ts"].to_pandas().values
        ids = np.asarray(g["event_id"].to_pylist(), dtype=np.int64)
        is_view = np.asarray(
            [t == "view" for t in g["event_type"].to_pylist()], dtype=bool
        )
        vts = ts[is_view]
        lo = np.searchsorted(vts, ts - w, side="left")
        hi = np.searchsorted(vts, ts, side="left")
        return pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "n_views_5m": pa.array(
                    (hi - lo).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(
        count_views, batch_format="pyarrow"
    )


def q_range_join_bucketed(sf_dir: str):
    """range_join WITHOUT the per-key-history assumption — and, unlike
    asof_join_bucketed, with NO carry pass at all: because the lookback
    window is BOUNDED (300 s), an event can only see views from its own
    (user, day) bucket plus the final 300 s of the previous day, so
    replicating just those boundary views forward as context-only rows
    makes every bucket self-contained. One map emits each event into
    its bucket (kind='evt') and each boundary view additionally into
    the next day's bucket (kind='ctx'); one groupby resolves counts
    inside the bucket. Replication volume is O(window/day_span) of the
    views — the bounded-window decomposition every windowed operator
    gets for free at 100 TB. Value-verified identical to the plain
    operator (same oracle + equivalence test)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    w = np.timedelta64(RANGE_WINDOW_S, "s")
    day_us = np.timedelta64(1, "D")

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_pandas().values
        day_dt = ts.astype("datetime64[D]")
        day_i = day_dt.astype(np.int64)  # int64 epoch-day shuffle key
        ids = np.asarray(t["event_id"].to_pylist(), dtype=np.int64)
        uid = np.asarray(t["user_id"].to_pylist(), dtype=np.int64)
        et = np.asarray(t["event_type"].to_pylist())
        is_view = et == "view"
        # boundary views: within the window of the NEXT day's start
        ctx = is_view & (ts >= day_dt.astype("datetime64[us]") + day_us - w)
        return pa.table(
            {
                "kind": pa.array(
                    ["evt"] * len(ids) + ["ctx"] * int(ctx.sum()),
                    pa.string(),
                ),
                "event_id": pa.array(
                    np.concatenate([ids, ids[ctx]]), pa.int64()
                ),
                "user_id": pa.array(
                    np.concatenate([uid, uid[ctx]]), pa.int64()
                ),
                "day": pa.array(
                    np.concatenate([day_i, day_i[ctx] + 1]), pa.int64()
                ),
                "ts": pa.array(
                    np.concatenate([ts, ts[ctx]]), pa.timestamp("us")
                ),
                "event_type": pa.array(
                    np.concatenate([et, et[ctx]]), pa.string()
                ),
            }
        )

    def count_in_bucket(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_pandas().values
        ids = np.asarray(g["event_id"].to_pylist(), dtype=np.int64)
        kind = np.asarray(g["kind"].to_pylist())
        et = np.asarray(g["event_type"].to_pylist())
        is_view = et == "view"
        vts = np.sort(ts[is_view])
        probe = kind == "evt"
        pts = ts[probe]
        lo = np.searchsorted(vts, pts - w, side="left")
        hi = np.searchsorted(vts, pts, side="left")
        return pa.table(
            {
                "event_id": pa.array(ids[probe], pa.int64()),
                "n_views_5m": pa.array(
                    (hi - lo).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["user_id", "day"])
        .map_groups(count_in_bucket, batch_format="pyarrow")
    )


HITS_ITERS = 3
HITS_SCALE = 10 ** 6


def _hits_rescale_q(max_s: int) -> int:
    """Per-half-step rescale divisor: ceil(max / SCALE), >= 1. Dividing
    by q (instead of multiplying by SCALE/max) keeps every intermediate
    <= n_nodes * SCALE — no int64 overflow up to ~9e12 nodes — while
    staying a single exact integer floor division on both engine
    routes and in the SQL oracle."""
    return max((max_s + HITS_SCALE - 1) // HITS_SCALE, 1)


def _hits_driver(pages_dir: str, iters: int = HITS_ITERS):
    """HITS on the driver for small graphs (same routing guard as
    pagerank): identical integer fixed-point arithmetic to the
    distributed route, so the two are bit-equal."""
    e = _outlinks_ds(pages_dir).to_pandas()
    edges = list(zip(e["src"].tolist(), e["dst"].tolist()))
    nodes = rd.read_parquet(pages_dir, columns=["url"]).to_pandas()[
        "url"
    ].tolist()
    h = {u: HITS_SCALE for u in nodes}
    a = {u: 0 for u in nodes}
    for _ in range(iters):
        araw = {u: 0 for u in nodes}
        for s, d in edges:
            araw[d] += h[s]
        qa = _hits_rescale_q(max(araw.values()))
        a = {u: v // qa for u, v in araw.items()}
        hraw = {u: 0 for u in nodes}
        for s, d in edges:
            hraw[s] += a[d]
        qh = _hits_rescale_q(max(hraw.values()))
        h = {u: v // qh for u, v in hraw.items()}
    return pa.table(
        {
            "url": pa.array(nodes, pa.string()),
            "authority": pa.array(
                [a[u] / float(HITS_SCALE) for u in nodes], pa.float64()
            ),
            "hub": pa.array(
                [h[u] / float(HITS_SCALE) for u in nodes], pa.float64()
            ),
        }
    )


def _hits_distributed(pages_dir: str, n: int, iters: int = HITS_ITERS):
    """HITS as iterative join + groupby dataflow — the two-sided twin of
    ``_pagerank_distributed``: each half-step joins the edge list to the
    current vector (authority pulls hub over src, hub pulls authority
    over dst), per-batch pre-sums the contributions (integer sums are
    exactly associative), groupby-sums across blocks, and rescales by a
    single scalar divisor read off a tiny max aggregate. Ghost 0-rows
    keep sink/source nodes alive without an outer join. Vectors are
    O(nodes) rows per round, materialized to cut lineage growth."""
    edges = _outlinks_ds(pages_dir).materialize()
    nparts = dd.adaptive_partitions(n * 4)
    nodes = rd.read_parquet(pages_dir, columns=["url"])
    hvec = nodes.map_batches(
        lambda t: pa.table(
            {"url": t["url"],
             "v": pa.array([HITS_SCALE] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    ghost = nodes.map_batches(
        lambda t: pa.table(
            {"k": t["url"], "w": pa.array([0] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def contrib(out_key: str):
        def f(t: pa.Table) -> pa.Table:
            part = (
                pa.table({"k": t[out_key], "w": t["v"]})
                .group_by("k")
                .aggregate([("w", "sum")])
            )
            return pa.table(
                {"k": part["k"], "w": pc.cast(part["w_sum"], pa.int64())}
            )

        return f

    def half_step(vec, edge_key: str, out_key: str):
        contribs = (
            sj.safe_join(edges, vec, join_type="inner",
                         num_partitions=nparts,
                         on=(edge_key,), right_on=("url",))
            .map_batches(contrib(out_key), batch_format="pyarrow",
                         zero_copy_batch=True)
            .union(ghost)
        )
        sums = _grouped_sum_str(contribs, "k", "w", "w_sum", nparts)
        q = _hits_rescale_q(int(sums.max("w_sum")))
        return sums.map_batches(
            lambda t: pa.table(
                {"url": t["k"],
                 "v": pc.divide(pc.cast(t["w_sum"], pa.int64()),
                                pa.scalar(q, pa.int64()))}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()

    avec = None
    for _ in range(iters):
        avec = half_step(hvec, "src", "dst")   # authority <- sum of hubs
        hvec = half_step(avec, "dst", "src")   # hub <- sum of authorities

    out = sj.safe_join(avec, hvec, join_type="inner",
                       num_partitions=nparts,
                       on=("url",), right_on=("url",),
                       right_suffix="_h")
    return out.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                "authority": pc.divide(
                    pc.cast(t["v"], pa.float64()),
                    pa.scalar(float(HITS_SCALE)),
                ),
                "hub": pc.divide(
                    pc.cast(t["v_h"], pa.float64()),
                    pa.scalar(float(HITS_SCALE)),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_hits_rank(sf_dir: str):
    """HITS hubs & authorities over the link graph (Kleinberg 1999) —
    the query-independent page-quality companion to PageRank: 3
    synchronous iterations of a <- A^T h, h <- A a with an integer
    fixed-point max-rescale per half-step (see _hits_rescale_q).
    Size-routed like pagerank/lm_score: small graphs iterate on the
    driver, big ones run the distributed join+groupby rounds — both
    routes use the same integer arithmetic and are bit-equal to each
    other and to the unrolled SQL oracle."""
    pages_dir = link_corpus()
    if LINK_N * 6 <= PR_DRIVER_EDGE_LIMIT:
        return _hits_driver(pages_dir)
    return _hits_distributed(pages_dir, LINK_N)


def q_approx_distinct_hll(sf_dir: str):
    """Approximate count-distinct of ``event_id`` via HyperLogLog
    (``stages/sketch.py``): per-block partials emit <= 64 (register,
    max-rank) rows however large the block, one bounded groupby merges
    registers by MAX (the HLL merge law), and a single-row reduce
    computes the estimator. The KMV companion with the opposite
    trade-off: HLL's shuffle is m rows per block (vs KMV's k = 256) and
    its state is registers, so sketches from disjoint corpora merge by
    elementwise max — the shape used for per-partition cardinality
    rollups at 10^12 rows. Deterministic md5 hashing + an exact-integer
    estimator (see hll_estimate_batch) make this an APPROXIMATE operator
    with an EXACT oracle, same contract as approx_distinct_kmv."""
    from ..stages import sketch as sk

    partials = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda t: sk.hll_partial_batch(t, "event_id"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    merged = partials.groupby("j").max("rank")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"j": t["j"], "rank": t["max(rank)"]})

    return (
        merged.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)
        .repartition(1)
        .map_batches(sk.hll_estimate_batch, batch_format="pyarrow",
                     batch_size=None)
    )


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix over events: users are cohorted by their
    first active day; each (cohort_day, day_offset) cell counts users
    from that cohort active on cohort_day + offset. One groupby(user)
    bounds the shuffle to DISTINCT (user, day) pairs (deduped per batch
    before the shuffle), then per-batch partial counts make the second
    shuffle move counters, not users — the analytics-warehouse op every
    event pipeline ends in."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        return (
            pa.table({"user_id": t["user_id"], "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    def per_user(g: pa.Table) -> pa.Table:
        days = np.unique(
            g["day"].to_numpy(zero_copy_only=False)
        )  # sorted datetime64[us]
        cohort = days[0]
        off = ((days - cohort) // np.timedelta64(1, "D")).astype(np.int64)
        # epoch-DAY int key through the shuffle (Ray's sort/aggregate
        # boundary sampling logs precision warnings on timestamp keys,
        # and an int64 shuffles cheaper); back to timestamp at the end
        cohort_day_i = int(
            cohort.astype("datetime64[D]").astype(np.int64)
        )
        return pa.table(
            {
                "cohort_day_i": pa.array(
                    np.full(len(days), cohort_day_i, dtype=np.int64),
                    pa.int64(),
                ),
                "day_offset": pa.array(off, pa.int64()),
                "n": pa.array(np.ones(len(days), np.int64), pa.int64()),
            }
        )

    def partials(t: pa.Table) -> pa.Table:
        part = t.group_by(["cohort_day_i", "day_offset"]).aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {
                "cohort_day_i": part["cohort_day_i"],
                "day_offset": part["day_offset"],
                "n": pc.cast(part["n_sum"], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .map_batches(partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["cohort_day_i", "day_offset"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n_users"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "cohort_day": pc.cast(
                    pc.multiply(t["cohort_day_i"],
                                pa.scalar(86_400_000_000, pa.int64())),
                    pa.timestamp("us"),
                ),
                "day_offset": t["day_offset"],
                "n_users": pc.cast(t["n_users"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_session_stats(sf_dir: str):
    """Per-session roll-up (the row-level companion to the per-user
    ``sessionize`` counts): sessions split at >30 min gaps within a
    (ts, event_id)-sorted per-user stream; each session row carries its
    1-based index, event count, exact microsecond duration, purchase
    count, and revenue in integer micro-units (floor(value*1e6 + 0.5),
    identical arithmetic both sides — order-free integer sums, no
    float-summation-order hazard). Same bounded-group caveat as
    sessionize; the bucketed decomposition pattern applies unchanged."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type", "value"])

    def sessions(g) -> "pa.Table":
        import pandas as pd

        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds()
        sid = ((gaps > SESSION_GAP_S) | gaps.isna()).cumsum()
        micro = np.floor(g["value"].values * 1_000_000 + 0.5).astype(
            np.int64
        )
        out = []
        for s, sub in g.assign(
            _sid=sid, _micro=micro
        ).groupby("_sid", sort=True):
            out.append(
                {
                    "user_id": int(sub["user_id"].iloc[0]),
                    "session_idx": int(s),
                    "n_events": len(sub),
                    "duration_us": int(
                        (sub["ts"].iloc[-1] - sub["ts"].iloc[0]).value
                        // 1000
                    ),
                    "n_purchases": int(
                        (sub["event_type"] == "purchase").sum()
                    ),
                    "revenue_micro": int(sub["_micro"].sum()),
                }
            )
        return pd.DataFrame(out)

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def _h60(u: str) -> int:
    """60-bit node id from md5 — fits int64 on both engines; SQL twin:
    ``('0x' || substr(md5(u), 1, 15))::bigint``. A collision would merge
    the same two components on BOTH sides (the id is the only identity),
    so value-parity is hash-independent; production graphs past ~1e8
    nodes should assign dense ids instead."""
    return int(hashlib.md5(u.encode("utf-8")).hexdigest()[:15], 16)


def q_mirror_domains(sf_dir: str):
    """Mirror-site clusters: weakly-connected components of the
    SYNDICATION graph (sources joined by at least one exact near-dup
    pair, ``syndication_pairs``) — the domain-level rollup that turns
    pairwise dup accounting into "these N sites republish one another;
    curate them as one". Same machinery as ``link_components``: md5-60
    node ids, self-loops so clean sources surface as singletons, the
    size-routed components stage, then id->name joins. The graph is
    source-cardinality-sized — tiny next to the corpus — so every step
    here is bounded by the number of domains, not documents."""
    pairs = q_syndication_pairs(sf_dir)
    srcs = _distinct_rows(
        _read(sf_dir, "documents", ["source"]), ["source"]
    )

    def hash_srcs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "hid": pa.array([], pa.int64())})
        return pa.table(
            {
                "source": t["source"],
                "hid": pa.array(
                    [_h60(s) for s in t["source"].to_pylist()], pa.int64()
                ),
            }
        )

    hmap = srcs.map_batches(hash_srcs, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    nparts = dd.adaptive_partitions(hmap.count())

    def to_ids(t: pa.Table) -> pa.Table:
        sa = t["src_a"].to_pylist()
        sb = t["src_b"].to_pylist()
        a_out, b_out = [], []
        for x, y in zip(sa, sb):
            if x != y:  # intra-source dups are not mirror edges
                a_out.append(_h60(x))
                b_out.append(_h60(y))
        return pa.table(
            {"a": pa.array(a_out, pa.int64()),
             "b": pa.array(b_out, pa.int64())}
        )

    self_loops = hmap.map_batches(
        lambda t: pa.table({"a": t["hid"], "b": t["hid"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    edges = pairs.map_batches(
        to_ids, batch_format="pyarrow"
    ).union(self_loops)
    comp = dd.connected_components(edges, num_partitions=nparts)
    cc_schema = pa.schema([("doc_id", pa.int64()), ("rep_id", pa.int64())])
    named = sj.safe_join(comp, hmap, join_type="inner",
                         num_partitions=nparts,
                         on=("doc_id",), right_on=("hid",),
                         left_schema=cc_schema)
    return (
        sj.safe_join(named, hmap, join_type="inner",
                     num_partitions=nparts,
                     on=("rep_id",), right_on=("hid",),
                     right_suffix="_rep")
        .map_batches(
            lambda t: pa.table(
                {"source": t["source"], "mirror_rep": t["source_rep"]}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


LP_ITERS = 4


def _lp_pre_count(t: pa.Table) -> pa.Table:
    """Per-batch (v, lab) combiner — duplicate neighbor-label mass
    collapses BEFORE the shuffle (the anchor_text shape), so a
    10^7-in-link hub never lands 10^7 rows in one group."""
    part = (
        pa.table({"v": t["v"], "lab": t["lab"]})
        .group_by(["v", "lab"])
        .aggregate([([], "count_all")])
    )
    return part.rename_columns(["v", "lab", "n"])


def _lp_argmax(g: pa.Table) -> pa.Table:
    """Per-node mode over the pre-summed (v, lab, n) rows; group size =
    DISTINCT labels among one node's neighbors (bounded by community
    count, not degree). Tie → (count desc, label asc) like the oracle."""
    idx = pc.sort_indices(
        g, sort_keys=[("n", "descending"), ("lab", "ascending")]
    )
    best = g["lab"].take(idx.slice(0, 1))
    return pa.table({"node": g["v"].slice(0, 1), "lab": best})


def q_label_prop(sf_dir: str):
    """Synchronous label-propagation community detection (Raghavan et
    al., PRE'07) over the undirected simple link graph, LP_ITERS
    rounds: a node adopts the most frequent label among its neighbors
    (tie → lexicographically smallest label), all nodes updating from
    the previous round's labels — deterministic, unlike the classic
    async/random-order variant, so the unrolled SQL oracle replays it
    exactly. Communities differ from link_components: min-label CC
    merges everything reachable; mode-propagation stops at sparse cuts
    (the intra-site cluster boundary signal). Each round is one hash
    join (directed edges ⋈ labels on the source endpoint) + one
    groupby(node) mode — the PageRank dataflow shape; labels stay
    (node, label) pairs, nothing corpus-sized on the driver."""
    und = _und_edges_ds(link_corpus()).materialize()
    nparts = dd.adaptive_partitions(LINK_N)

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "u": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        )

    dire = und.map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()
    # init labels = distinct nodes, each labeled by itself: per-batch
    # Arrow unique then a hash-aggregate Min — fully vectorized, no
    # per-node Python group (the round-3 ADVICE item)
    labels = dire.map_batches(
        lambda t: pa.table({"node": pc.unique(t["v"].combine_chunks())}),
        batch_format="pyarrow",
    ).groupby("node").aggregate(
        ray.data.aggregate.Min("node", alias_name="lab")
    ).materialize()

    for _ in range(LP_ITERS):
        nbr = sj.safe_join(dire, labels, join_type="inner",
                           num_partitions=nparts,
                           on=("u",), right_on=("node",))
        labels = (
            nbr.map_batches(_lp_pre_count, batch_format="pyarrow")
            .groupby(["v", "lab"])
            .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
            .groupby("v")
            .map_groups(_lp_argmax, batch_format="pyarrow")
            .materialize()
        )

    return labels.map_batches(
        lambda t: pa.table({"url": t["node"], "community": t["lab"]}),
        batch_format="pyarrow",
    )


def q_link_components(sf_dir: str):
    """Weakly-connected components of the INTRA-domain link subgraph
    (site-section segmentation: cross-domain edges cut, so components =
    navigational clusters within each site). Nodes are md5-60-bit ids
    (_h60); edges keep only same-host, non-self links whose target is a
    known page (hash join against the page list — never a broadcast of
    the corpus-sized url set); every page contributes a self-loop so
    singletons surface. Components via stages/dedup.connected_components
    (size-routed union-find task / distributed min-label propagation),
    then two hash joins map (node, rep) ids back to urls."""
    pages_dir = link_corpus()
    pages = rd.read_parquet(pages_dir, columns=["url"])

    def host(u: str) -> str:
        parts = u.split("://", 1)
        rest = parts[1] if len(parts) == 2 else ""
        return rest.split("/", 1)[0]

    def intra(t: pa.Table) -> pa.Table:
        src = t["src"].to_pylist()
        dst = t["dst"].to_pylist()
        keep_s, keep_d = [], []
        for s, d in zip(src, dst):
            if s != d and host(s) == host(d):
                keep_s.append(s)
                keep_d.append(d)
        return pa.table(
            {
                "src": pa.array(keep_s, pa.string()),
                "dst": pa.array(keep_d, pa.string()),
            }
        )

    def hash_pages(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "hid": pa.array(
                    [_h60(u) for u in t["url"].to_pylist()], pa.int64()
                ),
            }
        )

    hmap = pages.map_batches(hash_pages, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    nparts = dd.adaptive_partitions(LINK_N)
    internal = sj.safe_join(
        _outlinks_ds(pages_dir).map_batches(
            intra, batch_format="pyarrow"
        ),
        hmap, join_type="inner", num_partitions=nparts,
        on=("dst",), right_on=("url",))

    def to_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(
                    [_h60(u) for u in t["src"].to_pylist()], pa.int64()
                ),
                "b": t["hid"],
            }
        )

    self_loops = hmap.map_batches(
        lambda t: pa.table({"a": t["hid"], "b": t["hid"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    edges = internal.map_batches(
        to_ids, batch_format="pyarrow"
    ).union(self_loops)
    comp = dd.connected_components(edges, num_partitions=nparts)
    cc_schema = pa.schema([("doc_id", pa.int64()), ("rep_id", pa.int64())])
    named = sj.safe_join(comp, hmap, join_type="inner",
                         num_partitions=nparts,
                         on=("doc_id",), right_on=("hid",),
                         left_schema=cc_schema)
    return (
        sj.safe_join(named, hmap, join_type="inner",
                     num_partitions=nparts,
                     on=("rep_id",), right_on=("hid",),
                     right_suffix="_rep")
        .map_batches(
            lambda t: pa.table(
                {"url": t["url"], "component": t["url_rep"]}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def q_graph_triangles(sf_dir: str):
    """Global triangle count of the undirected simple link graph (the
    clustering / community-density signal; Suri & Vassilvitskii's
    join-based formulation): dedup the multigraph into oriented edges
    (a < b) via one groupby, self-join on the shared middle vertex to
    enumerate wedges (a<b<c), then a multi-key hash join back against
    the edge set closes them. Each triangle is counted exactly once by
    the total order. At web scale the orientation would be by DEGREE
    (low-degree vertex first) to bound wedges on skewed graphs; id
    order keeps the oracle exact here and the join shape identical."""
    pages_dir = link_corpus()
    e = _outlinks_ds(pages_dir)

    def orient(t: pa.Table) -> pa.Table:
        src, dst = t["src"], t["dst"]
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        lo = pc.min_element_wise(src, dst)
        hi = pc.max_element_wise(src, dst)
        return (
            pa.table({"a": lo, "b": hi})
            .group_by(["a", "b"])
            .aggregate([])
        )

    nparts = dd.adaptive_partitions(LINK_N)
    und = (
        e.map_batches(orient, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(ray.data.aggregate.Count(alias_name="_n"))
        .select_columns(["a", "b"])
        .materialize()
    )
    und_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    wedges = sj.safe_join(und, und, join_type="inner",
                          num_partitions=nparts,
                          on=("b",), right_on=("a",), right_suffix="_2",
                          left_schema=und_schema)
    tris = sj.safe_join(wedges, und, join_type="inner",
                        num_partitions=nparts,
                        on=("a", "b_2"), right_on=("a", "b"),
                        right_suffix="_3")
    n = tris.count()
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


COLLOC_MIN_COUNT = 5
COLLOC_VOCAB_BROADCAST_LIMIT = 2_000_000


def q_collocations(sf_dir: str):
    """Collocation mining over the corpus (the phrase-discovery /
    tokenizer-seeding signal): adjacent-token bigrams scored by LIFT
    (observed/expected frequency ratio — the exp of PMI, so the same
    ranking without a cross-engine ln). Tokenization is the dedup
    family's ASCII-whitespace split (SQL_TOKENIZE parity). Per-batch
    partial counts collapse both shuffles to (token, n) counters; the
    two count joins run on the already-tiny >= min-count bigram set.
    The lift division is written with the IDENTICAL association order
    on both engines so the doubles agree bit-for-bit before round(6)."""
    docs = _read(sf_dir, "documents", ["text"])

    def bigram_partials(t: pa.Table) -> pa.Table:
        agg: dict[tuple[str, str], int] = {}
        for s in t["text"].to_pylist():
            toks = [w for w in dd._WS_RE.split(s or "") if w]
            for w1, w2 in zip(toks, toks[1:]):
                agg[(w1, w2)] = agg.get((w1, w2), 0) + 1
        keys = list(agg.keys())
        return pa.table(
            {
                "w1": pa.array([k[0] for k in keys], pa.string()),
                "w2": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    def unigram_partials(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for s in t["text"].to_pylist():
            for w in dd._WS_RE.split(s or ""):
                if w:
                    agg[w] = agg.get(w, 0) + 1
        return pa.table(
            {
                "w": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    big = (
        docs.map_batches(bigram_partials, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="c_ab"))
        .materialize()
    )
    uni = (
        docs.map_batches(unigram_partials, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("w")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="c"))
        .materialize()
    )
    # totals read off the materialized count tables — no recompute pass
    n_tok = int(uni.sum("c"))
    n_pairs = int(big.sum("c_ab"))
    n_vocab = uni.count()
    sel = big.filter(expr=f"c_ab >= {COLLOC_MIN_COUNT}")

    def lift_cols(t: pa.Table, c_a: np.ndarray,
                  c_b: np.ndarray) -> pa.Table:
        c_ab = t["c_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        # EXACT shape mirrored in SQL: (c_ab*n_tok*n_tok) / ((n_pairs*c_a)*c_b)
        lift = (c_ab * float(n_tok) * float(n_tok)) / (
            (float(n_pairs) * c_a.astype(np.float64))
            * c_b.astype(np.float64)
        )
        return pa.table(
            {
                "w1": t["w1"],
                "w2": t["w2"],
                "c_ab": t["c_ab"],
                "c_a": pa.array(c_a.astype(np.int64), pa.int64()),
                "c_b": pa.array(c_b.astype(np.int64), pa.int64()),
                "lift": pa.array(np.round(lift, 6), pa.float64()),
            }
        )

    if n_vocab <= COLLOC_VOCAB_BROADCAST_LIMIT:
        # vocab-count lookup is the canonical broadcast join: ray.put
        # the (word -> count) map once, read it per task — no shuffle,
        # and no hash-join fragility on a small side (a partition that
        # receives zero shards of one side breaks the Arrow join)
        udf = uni.to_pandas()
        cmap_ref = ray.put(
            dict(zip(udf["w"].tolist(), udf["c"].astype(int).tolist()))
        )

        def score_broadcast(t: pa.Table) -> pa.Table:
            m = ray.get(cmap_ref)
            c_a = np.array([m[w] for w in t["w1"].to_pylist()],
                           dtype=np.int64)
            c_b = np.array([m[w] for w in t["w2"].to_pylist()],
                           dtype=np.int64)
            return lift_cols(t, c_a, c_b)

        return sel.map_batches(score_broadcast, batch_format="pyarrow",
                               zero_copy_batch=True)

    # open-web vocabularies past the broadcast limit: two distributed
    # hash joins on the (already >= min-count filtered) bigram set
    nparts = dd.adaptive_partitions(n_vocab, rows_per_part=50_000)
    j1 = sj.safe_join(sel, uni, join_type="inner",
                      num_partitions=nparts,
                      on=("w1",), right_on=("w",))
    j2 = sj.safe_join(j1, uni, join_type="inner",
                      num_partitions=nparts,
                      on=("w2",), right_on=("w",), right_suffix="_b")

    def score_joined(t: pa.Table) -> pa.Table:
        return lift_cols(
            t,
            t["c"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["c_b"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    return j2.map_batches(score_joined, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_posting_gaps(sf_dir: str):
    """Gap-encoded inverted index (the index-compression layout: sorted
    posting lists stored as deltas): distinct (term, doc_id) postings,
    one shuffle on term, per-term sorted doc ids emitted as (idx, doc_id,
    gap) rows with gap = delta to the previous posting (first = the id
    itself). Row-per-posting output streams; no list columns to blow a
    block on a stop-word's million-entry posting list."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        d_out: list[int] = []
        t_out: list[str] = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in {w for w in (s or "").split(" ") if w}:
                d_out.append(did)
                t_out.append(w)
        return pa.table(
            {
                "term": pa.array(t_out, pa.string()),
                "doc_id": pa.array(d_out, pa.int64()),
            }
        )

    def gaps(g: pa.Table) -> pa.Table:
        ids = np.unique(
            np.asarray(g["doc_id"].to_pylist(), dtype=np.int64)
        )
        prev = np.concatenate(([0], ids[:-1]))
        return pa.table(
            {
                "term": pa.array(
                    [g["term"][0].as_py()] * len(ids), pa.string()
                ),
                "idx": pa.array(
                    np.arange(1, len(ids) + 1, dtype=np.int64), pa.int64()
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "gap": pa.array(ids - prev, pa.int64()),
            }
        )

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .map_groups(gaps, batch_format="pyarrow")
    )


def q_quantiles_by_domain(sf_dir: str):
    """Exact per-domain length quantiles (the corpus-profiling op behind
    per-source mix decisions): p50/p90 of n_chars per source via the
    explicit order-statistic index floor((n-1)*q) — one definition, no
    interpolation-mode ambiguity, identical on both engines. One
    groupby(source); each group sorts its own lengths (bounded by the
    per-source doc count — the same bounded-group caveat as sessionize,
    with the same bucketed-decomposition escape if a source outgrows a
    group)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])

    def stats(g: pa.Table) -> pa.Table:
        v = np.sort(np.asarray(g["n_chars"].to_pylist(), dtype=np.int64))
        n = len(v)
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "n_docs": pa.array([n], pa.int64()),
                "p50_chars": pa.array([int(v[(n - 1) // 2])], pa.int64()),
                "p90_chars": pa.array(
                    [int(v[((n - 1) * 9) // 10])], pa.int64()
                ),
            }
        )

    return docs.groupby("source").map_groups(stats, batch_format="pyarrow")


def q_url_history(sf_dir: str):
    """Per-url capture history over the re-crawl corpus (the CDX-side
    lifecycle analytics a crawl scheduler feeds on): first/last capture,
    capture count, distinct content revisions, and churn in integer PPM
    ((n_revisions-1)*1e6 // (n_captures-1) — the fraction of re-crawls
    that found new content). One groupby(url); a url's history is
    bounded by crawl frequency, never corpus-sized."""

    def hist(g: pa.Table) -> pa.Table:
        ts = np.sort(g["warc_ts"].to_numpy(zero_copy_only=False))
        n = len(ts)
        n_rev = len({t or "" for t in g["text"].to_pylist()})
        churn = ((n_rev - 1) * 1_000_000) // (n - 1) if n > 1 else 0
        return pa.table(
            {
                "url": pa.array([g["url"][0].as_py()], pa.string()),
                "first_ts": pa.array([ts[0]], pa.timestamp("us")),
                "last_ts": pa.array([ts[-1]], pa.timestamp("us")),
                "n_captures": pa.array([n], pa.int64()),
                "n_revisions": pa.array([n_rev], pa.int64()),
                "churn_ppm": pa.array([churn], pa.int64()),
            }
        )

    return (
        rd.read_parquet(recrawl_corpus(), columns=["url", "warc_ts", "text"])
        .groupby("url")
        .map_groups(hist, batch_format="pyarrow")
    )


def q_scd2_intervals(sf_dir: str):
    """Slowly-changing-dimension (type 2) build over the re-crawl
    snapshots: per url, consecutive captures with IDENTICAL content are
    compressed into one validity interval (content_md5, valid_from,
    valid_to, n_captures), the open current interval carrying a NULL
    valid_to — the lakehouse history-table shape a crawl archive serves
    point-in-time queries from. One groupby(url) whose group is a url's
    capture history (bounded by crawl frequency, never corpus-sized);
    inside the group it's one sorted linear scan."""

    def intervals(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("warc_ts", "ascending")])
        g = g.take(idx)
        url = g["url"][0].as_py()
        tss = g["warc_ts"].to_pylist()
        hs = [
            hashlib.md5((t or "").encode()).hexdigest()
            for t in g["text"].to_pylist()
        ]
        starts, counts = [], []
        for i, h in enumerate(hs):
            if i == 0 or h != hs[i - 1]:
                starts.append(i)
                counts.append(1)
            else:
                counts[-1] += 1
        froms = [tss[s] for s in starts]
        tos = froms[1:] + [None]
        return pa.table(
            {
                "url": pa.array([url] * len(starts), pa.string()),
                "content_md5": pa.array(
                    [hs[s] for s in starts], pa.string()
                ),
                "valid_from": pa.array(froms, pa.timestamp("us")),
                "valid_to": pa.array(tos, pa.timestamp("us")),
                "n_captures": pa.array(counts, pa.int64()),
            }
        )

    return (
        rd.read_parquet(recrawl_corpus(), columns=["url", "warc_ts", "text"])
        .groupby("url")
        .map_groups(intervals, batch_format="pyarrow")
    )


def q_late_events(sf_dir: str):
    """Watermark / late-arrival audit of the event stream: within each
    user's ARRIVAL order (event_id — the ingestion sequence), an event
    is late when its timestamp is behind the running max of all prior
    events. Emits per user the late count and the worst lateness in
    exact integer microseconds — the out-of-orderness profile that
    sizes a streaming pipeline's watermark delay. One groupby(user);
    inside the (bounded) group a numpy running-max scan."""

    def audit(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("event_id", "ascending")])
        g = g.take(idx)
        us = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        runmax = np.maximum.accumulate(us)
        wm = np.concatenate(([np.iinfo(np.int64).min], runmax[:-1]))
        late = us < wm
        worst = int((wm - us)[late].max()) if late.any() else 0
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_events": pa.array([len(us)], pa.int64()),
                "n_late": pa.array([int(late.sum())], pa.int64()),
                "max_lateness_us": pa.array([worst], pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts"])
        .groupby("user_id")
        .map_groups(audit, batch_format="pyarrow")
    )


def urltrap_corpus() -> str:
    """Lazily write the deterministic crawler-trap url fixture
    (sf-independent fixed path); both the Ray query and the oracle
    composer call this, so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_urltrap_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_urltrap_600")
    return write_urltrap_corpus(root, n=600, seed=1)


# crawler-trap gate: a template is a trap when it explodes into many
# urls that serve few distinct page bodies. Integer cross-multiplied
# threshold (house style — no float comparison in the gate).
TRAP_MIN_URLS = 20
TRAP_DUP_FACTOR = 5


def _distinct_rows(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Exact distinct over string-keyed rows: salt-partition shuffle +
    per-partition Arrow C++ ``group_by`` — the string-key generalization
    of ``_distinct_pairs`` (Dataset.groupby(...).aggregate combines rows
    at Python speed; the salted shape dedups in Arrow's hash table). The
    crc32 salt is deterministic per row key, so duplicates co-locate and
    the distinct is exact."""
    import zlib

    n_parts = max(8, int(ray.cluster_resources().get("CPU", 4)) * 2)

    def salt(t: pa.Table) -> pa.Table:
        key_cols = [t[c].to_pylist() for c in cols]
        p = [
            zlib.crc32("|".join(vals).encode("utf-8")) % n_parts
            for vals in zip(*key_cols)
        ]
        return t.append_column("p", pa.array(p, pa.int64()))

    def dedup_part(g: pa.Table) -> pa.Table:
        return g.select(cols).group_by(cols).aggregate([])

    return (
        ds.map_batches(salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .map_groups(dedup_part, batch_format="pyarrow")
    )


def q_url_templates(sf_dir: str):
    """URL-template mining / crawler-trap detection (the Heritrix /
    production-crawler frontier-hygiene stage): collapse every url to
    its template (query values -> ``=V`` first, then digit runs ->
    ``N``) and score each template by url fan-out vs content diversity.
    Calendar crossproducts and session-id urls collapse to ONE template
    with hundreds of urls over a handful of distinct bodies -> trap;
    article templates keep one body per url -> clean.

    Distributed shape at 10^12 urls: stateless template map, then BOTH
    distinct counts are decomposed so no group ever holds a template's
    full url set — dedup rows by (template, md5(url)) / (template,
    md5(text)) in salted Arrow C++ partitions, count the survivors per
    template, and join the two count tables (template-cardinality-sized,
    tiny). A naive groupby(template).map_groups would concentrate a
    trap's millions of urls in one task — exactly the skew this avoids."""
    pages = rd.read_parquet(urltrap_corpus(), columns=["url", "text"])

    def tmpl(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        tm = [
            re.sub(r"[0-9]+", "N", re.sub(r"=[^&#]*", "=V", u))
            for u in urls
        ]
        uh = [hashlib.md5(u.encode("utf-8")).hexdigest() for u in urls]
        th = [
            hashlib.md5((x or "").encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "template": pa.array(tm, pa.string()),
                "uh": pa.array(uh, pa.string()),
                "th": pa.array(th, pa.string()),
            }
        )

    rows = pages.map_batches(
        tmpl, batch_format="pyarrow", zero_copy_batch=True
    )
    nu = _grouped_count(
        _distinct_rows(rows.select_columns(["template", "uh"]),
                       ["template", "uh"]),
        key="template", out="n_urls",
    )
    nt = _grouped_count(
        _distinct_rows(rows.select_columns(["template", "th"]),
                       ["template", "th"]),
        key="template", out="n_texts",
    )

    # combine the two count tables via tagged union + a bounded groupby
    # (<= 2 rows per template group) rather than Dataset.join: the salted
    # count outputs carry empty zero-schema blocks for unused salt
    # partitions (tiny key cardinality << n_parts), which the groupby
    # shuffle tolerates but pyarrow's per-partition join rejects
    # ("No match for FieldRef" on a schemaless empty block).
    def tag(kind: int, col: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table(
                    {"template": pa.array([], pa.string()),
                     "kind": pa.array([], pa.int64()),
                     "v": pa.array([], pa.int64())}
                )
            return pa.table(
                {"template": t["template"],
                 "kind": pa.array([kind] * t.num_rows, pa.int64()),
                 "v": pc.cast(t[col], pa.int64())}
            )

        return f

    both = nu.map_batches(tag(0, "n_urls"), batch_format="pyarrow").union(
        nt.map_batches(tag(1, "n_texts"), batch_format="pyarrow")
    )

    def pivot(g: pa.Table) -> pa.Table:
        m = dict(zip(g["kind"].to_pylist(), g["v"].to_pylist()))
        n_urls, n_texts = m.get(0, 0), m.get(1, 0)
        return pa.table(
            {
                "template": g["template"].slice(0, 1),
                "n_urls": pa.array([n_urls], pa.int64()),
                "n_texts": pa.array([n_texts], pa.int64()),
                "trap": pa.array(
                    [n_urls >= TRAP_MIN_URLS
                     and n_texts * TRAP_DUP_FACTOR <= n_urls],
                    pa.bool_(),
                ),
            }
        )

    return both.groupby("template").map_groups(pivot,
                                               batch_format="pyarrow")


def q_degree_distribution(sf_dir: str):
    """Out-degree histogram of the link multigraph (the power-law
    profile every crawl audit starts with): per-batch partial counts
    per src collapse the first shuffle to counters, a second tiny
    groupby over (degree) buckets yields the histogram. Both shuffles
    move O(distinct keys), never edges."""
    e = _outlinks_ds(link_corpus())

    def partial(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for s in t["src"].to_pylist():
            agg[s] = agg.get(s, 0) + 1
        return pa.table(
            {
                "src": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    deg = (
        e.map_batches(partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="out_degree"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        part = (
            t.select(["out_degree"])
            .group_by("out_degree")
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["out_degree", "n"])

    return (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("out_degree")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n_pages"))
        .map_batches(
            lambda t: pa.table(
                {
                    "out_degree": pc.cast(t["out_degree"], pa.int64()),
                    "n_pages": pc.cast(t["n_pages"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


TOP_DOCS_PER_SOURCE = 3


def q_top_docs_per_source(sf_dir: str):
    """Per-group top-K (the best-exemplars-per-source curation op):
    top-3 docs per source by (n_chars desc, doc_id asc). Per-batch
    partial top-K per key pre-prunes BEFORE the shuffle (a group's
    global top-3 is a subset of the union of its per-batch top-3s), so
    the groupby moves at most 3 x sources x blocks rows, not the
    corpus; the final per-group sort sees <= 3 x blocks rows."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    keys = [("source", "ascending"), ("n_chars", "descending"),
            ("doc_id", "ascending")]

    def partial_topk(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        src = t["source"].to_pylist()
        keep, seen, last = [], 0, None
        for i, s in enumerate(src):
            if s != last:
                last, seen = s, 0
            seen += 1
            if seen <= TOP_DOCS_PER_SOURCE:
                keep.append(i)
        return t.take(pa.array(keep, pa.int64()))

    def final_topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        top = g.take(idx.slice(0, TOP_DOCS_PER_SOURCE))
        return top.append_column(
            "rank", pa.array(range(1, top.num_rows + 1), pa.int64())
        )

    return (
        docs.map_batches(partial_topk, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
    )


# dedup_eval sample: the K docs with the smallest md5(doc_id) ranks
# (the hash-rank idiom sample_reservoir uses) — a FIXED absolute size
# however big the corpus grows, so the all-pairs ground-truth task is
# O(K^2) = O(1); a constant keep-RATE would grow the quadratic truth
# with the input
DEDUP_EVAL_K = 200


def _eval_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic fixed-size hash-rank sample (the K smallest
    md5(doc_id) ranks) shared by the dedup evaluators: the quadratic
    exact-truth cost is bounded by K regardless of corpus size."""
    import hashlib as _hl

    from ..stages.topk import dataset_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def rank(t: pa.Table) -> pa.Table:
        r = [
            int.from_bytes(_hl.md5(str(i).encode()).digest()[:4], "big")
            for i in t["doc_id"].to_pylist()
        ]
        return t.append_column("r", pa.array(r, pa.int64()))

    return dataset_topk(
        docs.map_batches(rank, batch_format="pyarrow",
                         zero_copy_batch=True),
        [("r", "ascending"), ("doc_id", "ascending")],
        DEDUP_EVAL_K,
    ).select_columns(["doc_id", "text"]).materialize()


def q_dedup_eval_lsh(sf_dir: str):
    """LSH quality evaluation (the measure-your-dedup op): run the
    production MinHash-LSH candidate generator over a deterministic
    fixed-size hash-rank sample (the K smallest md5(doc_id) ranks),
    compute the EXACT all-pairs n-gram-Jaccard >= 0.5 ground truth on
    that same sample in one task, and report candidate precision/recall
    in integer PPM. Evaluation on a fixed-size sample is the scale
    path: the expensive exact truth never grows with the corpus, while
    the candidate side exercises the real pipeline code end-to-end."""
    sample = _eval_sample(sf_dir)
    pred = _distinct_pairs(_lsh_candidate_pairs(sf_dir, docs=sample))

    def truth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        order = np.argsort(np.asarray(ids, dtype=np.int64))
        a_out, b_out = [], []
        for xi in range(len(order)):
            for yi in range(xi + 1, len(order)):
                i, j = order[xi], order[yi]
                if dd.ngram_jaccard(texts[i] or "", texts[j] or "") >= 0.5:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
            }
        )

    truth_ds = sample.repartition(1).map_batches(
        truth, batch_format="pyarrow", batch_size=None
    ).materialize()
    pred = pred.materialize()
    n_pred = pred.count()
    n_true = truth_ds.count()
    # the truth set is O(sample^2) BOUNDED (constant-size sample), so
    # broadcast-membership beats a pair join: ray.put the set once,
    # count hits per batch, sum the partials
    tset_ref = ray.put(
        set(zip(truth_ds.to_pandas()["a"], truth_ds.to_pandas()["b"]))
        if n_true else set()
    )

    def tp_partial(t: pa.Table) -> pa.Table:
        ts = ray.get(tset_ref)
        n = sum(
            (a, b) in ts
            for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist())
        )
        return pa.table({"n": pa.array([n], pa.int64())})

    tp = (
        int(pred.map_batches(tp_partial, batch_format="pyarrow").sum("n"))
        if n_pred else 0
    )
    return pa.table(
        {
            "n_pred": pa.array([n_pred], pa.int64()),
            "n_true": pa.array([n_true], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "precision_ppm": pa.array(
                [tp * 1_000_000 // n_pred if n_pred else 0], pa.int64()
            ),
            "recall_ppm": pa.array(
                [tp * 1_000_000 // n_true if n_true else 0], pa.int64()
            ),
        }
    )


def q_dedup_eval_exact(sf_dir: str):
    """LSH evaluated against EXACT ground truth over the WHOLE corpus —
    upgrade of ``dedup_eval_lsh``'s sampled estimate, possible because
    the prefix-filter join (``setsim_join``) computes the complete
    J >= 0.6 truth as a dataflow: no quadratic step, no sample. Recall
    answers "how many true near-dup pairs does the MinHash banding
    miss?"; precision is the candidate-verification cost multiplier.
    TP via a distributed two-key pair join (truth is corpus-sized in
    principle — never a broadcast set here). Integer-PPM metrics, one
    row."""
    truth = q_setsim_join(sf_dir).select_columns(["a", "b"]).materialize()
    pred = _lsh_distinct_pairs(sf_dir).materialize()
    n_true = truth.count()
    n_pred = pred.count()
    tp = (
        sj.safe_join(
            truth, pred, join_type="inner",
            num_partitions=dd.adaptive_partitions(max(n_true, n_pred)),
            on=("a", "b"),
            left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
        ).count()
        if n_true and n_pred
        else 0
    )
    return pa.table(
        {
            "n_pred": pa.array([n_pred], pa.int64()),
            "n_true": pa.array([n_true], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "precision_ppm": pa.array(
                [tp * 1_000_000 // n_pred if n_pred else 0], pa.int64()
            ),
            "recall_ppm": pa.array(
                [tp * 1_000_000 // n_true if n_true else 0], pa.int64()
            ),
        }
    )


# fixed positional-phrase query set (3-token adjacency, overlap-aware)
PHRASES = [
    "the fast key",
    "join order batch",
    "sort merge part",
    "data slow small",
]


SWEEP_TAUS_1E4 = [3000, 4000, 5000, 6000, 7000, 8000, 9000]


def q_dedup_threshold_sweep(sf_dir: str):
    """Precision/recall SWEEP over Jaccard thresholds — the tuning
    companion of ``dedup_eval_lsh``: which similarity cutoff should the
    near-dup verifier use for THIS corpus? The LSH candidate set is
    tau-independent (banding is fixed), so candidates are generated once;
    one bounded quadratic task over the shared hash-rank sample computes
    every pair's exact (intersection, union) shingle counts, and each
    tau's truth/tp derive by integer cross-multiply
    (J >= tau  <=>  inter * 1e4 >= tau * union — no float thresholds).
    Output: one row per tau with integer-PPM precision/recall. Scale:
    the sample is constant-size, candidates over it are bounded, the
    corpus is never touched beyond the sample selection pass."""
    sample = _eval_sample(sf_dir)
    pred = _distinct_pairs(_lsh_candidate_pairs(sf_dir, docs=sample))
    # bounded by sample^2 — a driver set here is the documented contract
    pred_pairs = {
        (int(r["a"]), int(r["b"])) for r in pred.take_all()
    }

    def sweep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        order = np.argsort(np.asarray(ids, dtype=np.int64))
        sets = [set(dd._shingles(texts[i] or "")) for i in order]
        sids = [ids[i] for i in order]
        pair_iu: list[tuple[int, int, int, int]] = []  # (a, b, i, u)
        for xi in range(len(sids)):
            for yi in range(xi + 1, len(sids)):
                inter = len(sets[xi] & sets[yi])
                union = len(sets[xi]) + len(sets[yi]) - inter
                pair_iu.append((sids[xi], sids[yi], inter, union))
        n_pred = len(pred_pairs)
        taus, npreds, ntrues, tps, precs, recs = [], [], [], [], [], []
        for tau in SWEEP_TAUS_1E4:
            n_true = tp = 0
            for a, b, i, u in pair_iu:
                if u == 0 or i * 10000 >= tau * u:  # both-empty => J=1
                    n_true += 1
                    if (a, b) in pred_pairs:
                        tp += 1
            taus.append(tau)
            npreds.append(n_pred)
            ntrues.append(n_true)
            tps.append(tp)
            precs.append(tp * 1_000_000 // n_pred if n_pred else 0)
            recs.append(tp * 1_000_000 // n_true if n_true else 0)
        return pa.table(
            {
                "tau_1e4": pa.array(taus, pa.int64()),
                "n_pred": pa.array(npreds, pa.int64()),
                "n_true": pa.array(ntrues, pa.int64()),
                "tp": pa.array(tps, pa.int64()),
                "precision_ppm": pa.array(precs, pa.int64()),
                "recall_ppm": pa.array(recs, pa.int64()),
            }
        )

    return sample.repartition(1).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )


def q_phrase_search(sf_dir: str):
    """Positional phrase search (the inverted-index-with-positions
    operation BM25 can't do): exact 3-token adjacency counts per doc for
    a fixed query-phrase set, overlap-aware. The map stage PRUNES at the
    source — it emits (doc_id, word, pos) posting rows ONLY for words
    that occur in some query phrase, so the shuffle carries a vanishing
    fraction of the corpus; the per-doc group (bounded by document
    length) then verifies adjacency pos+1/pos+2 per phrase. This is the
    query-time half of a positional index: at 10^12 docs the same
    posting layout is what you'd persist, keyed by (word, doc_id)."""
    qwords = {w for p in PHRASES for w in p.split()}
    phrase_toks = [p.split() for p in PHRASES]

    def postings(t: pa.Table) -> pa.Table:
        d_out, w_out, p_out = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            toks = (txt or "").split(" ")
            for i, w in enumerate(toks):
                if w in qwords:
                    d_out.append(did)
                    w_out.append(w)
                    p_out.append(i)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "w": pa.array(w_out, pa.string()),
                "pos": pa.array(p_out, pa.int64()),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        did = g["doc_id"][0].as_py()
        by_word: dict[str, set[int]] = {}
        for w, p in zip(g["w"].to_pylist(), g["pos"].to_pylist()):
            by_word.setdefault(w, set()).add(p)
        ph_out, n_out = [], []
        for phrase, toks in zip(PHRASES, phrase_toks):
            first = by_word.get(toks[0], set())
            n = sum(
                1
                for p in first
                if p + 1 in by_word.get(toks[1], set())
                and p + 2 in by_word.get(toks[2], set())
            )
            if n:
                ph_out.append(phrase)
                n_out.append(n)
        return pa.table(
            {
                "phrase": pa.array(ph_out, pa.string()),
                "doc_id": pa.array([did] * len(ph_out), pa.int64()),
                "n_occ": pa.array(n_out, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .map_groups(verify, batch_format="pyarrow")
    )


DECAY_HALFLIFE_US = 3_600 * 1_000_000  # one hour per halving step


def q_decayed_counts(sf_dir: str):
    """Time-decayed activity score per event type — the freshness-
    weighted counter behind trending/recency features. Classic
    exponential decay sums floats whose value depends on summation
    order; this is the EXACT integer formulation: each event weighs
    2^-k micro-units where k = full halflives between the event and the
    corpus's max timestamp (1e6 >> k — a right shift, zero float ops),
    so the sum is associative, restart-stable and bit-identical to the
    SQL replay. One bounded aggregate for t_ref (an O(1) driver
    scalar), then per-batch partial sums -> a tiny groupby(event_type).
    At 10^12 events the same shape holds: the shuffle carries one
    partial row per (block, type)."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])
    import pandas as pd

    ref_us = pd.Timestamp(ev.max("ts")).value // 1000  # ns -> us, exact

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        k = np.minimum((ref_us - us) // DECAY_HALFLIFE_US, 30).astype(
            np.int64
        )
        w = (1_000_000 >> k).astype(np.int64)
        aug = pa.table(
            {
                "event_type": t["event_type"],
                "w": pa.array(w),
                "one": pa.array(np.ones(len(w), dtype=np.int64)),
            }
        )
        r = aug.group_by("event_type").aggregate(
            [("w", "sum"), ("one", "sum")]
        )
        return r.rename_columns(["event_type", "w", "n"])

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("w", alias_name="decayed_micro"),
            ray.data.aggregate.Sum("n", alias_name="n_events"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "decayed_micro": pc.cast(t["decayed_micro"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_pivot_events(sf_dir: str):
    """Wide pivot of the event stream (the activity-feature table a
    ranking model trains on): one row per user with per-event-type
    counts and total value in integer micro-units. Per-batch Arrow
    group_by collapses the shuffle to one counter row per (user, batch);
    the Dataset groupby then sums counters — classic two-level
    aggregation, no row ever crosses the wire twice."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        micro = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 1_000_000 + 0.5
        ).astype(np.int64)
        aug = pa.table(
            {
                "user_id": t["user_id"],
                "v": pa.array((et == "view").astype(np.int64)),
                "c": pa.array((et == "click").astype(np.int64)),
                "p": pa.array((et == "purchase").astype(np.int64)),
                "m": pa.array(micro, pa.int64()),
            }
        )
        part = aug.group_by("user_id").aggregate(
            [("v", "sum"), ("c", "sum"), ("p", "sum"), ("m", "sum")]
        )
        return part.rename_columns(["user_id", "v", "c", "p", "m"])

    agg = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            ray.data.aggregate.Sum("v", alias_name="n_view"),
            ray.data.aggregate.Sum("c", alias_name="n_click"),
            ray.data.aggregate.Sum("p", alias_name="n_purchase"),
            ray.data.aggregate.Sum("m", alias_name="value_micro"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "n_view": pc.cast(t["n_view"], pa.int64()),
                "n_click": pc.cast(t["n_click"], pa.int64()),
                "n_purchase": pc.cast(t["n_purchase"], pa.int64()),
                "value_micro": pc.cast(t["value_micro"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_rollup_source_lang(sf_dir: str):
    """ROLLUP(source, lang) corpus accounting (the mix report every
    training-set readme carries): doc counts and char sums at the
    (source, lang), (source) and grand-total levels, null-marked like
    SQL ROLLUP. Computed the scale-right way: the finest level
    aggregates once from the corpus (two-level partial sums); the two
    coarser levels re-aggregate the FINEST AGGREGATE — O(sources x
    langs) rows — never the corpus again."""
    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def partials(t: pa.Table) -> pa.Table:
        part = t.group_by(["source", "lang"]).aggregate(
            [("n_chars", "sum"), ([], "count_all")]
        )
        return part.rename_columns(["source", "lang", "chars", "n"])

    fine = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(
            ray.data.aggregate.Sum("chars", alias_name="chars"),
            ray.data.aggregate.Sum("n", alias_name="n_docs"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "source": t["source"],
                    "lang": t["lang"],
                    "n_docs": pc.cast(t["n_docs"], pa.int64()),
                    "sum_chars": pc.cast(t["chars"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .materialize()
    )

    def coarsen(keep_source: bool):
        def f(t: pa.Table) -> pa.Table:
            keys = ["source"] if keep_source else []
            g = (
                t.append_column("one", pa.array([1] * t.num_rows,
                                                pa.int64()))
                if not keys else t
            )
            part = (
                g.group_by(keys if keys else ["one"]).aggregate(
                    [("n_docs", "sum"), ("sum_chars", "sum")]
                )
            )
            src = (
                part["source"] if keep_source
                else pa.array([None] * part.num_rows, pa.string())
            )
            return pa.table(
                {
                    "source": src,
                    "lang": pa.array([None] * part.num_rows, pa.string()),
                    "n_docs": pc.cast(part["n_docs_sum"], pa.int64()),
                    "sum_chars": pc.cast(part["sum_chars_sum"],
                                         pa.int64()),
                }
            )

        return f

    # the finest aggregate is tiny (sources x langs): one block derives
    # both rollup levels exactly
    small = fine.repartition(1)
    by_source = small.map_batches(coarsen(True), batch_format="pyarrow",
                                  batch_size=None)
    total = small.map_batches(coarsen(False), batch_format="pyarrow",
                              batch_size=None)
    return fine.union(by_source).union(total)


def q_running_total(sf_dir: str):
    """Per-user running totals over the (ts, event_id)-ordered stream
    (the cumulative-spend feature): each event row carries its 1-based
    sequence number and the cumulative value in integer micro-units.
    One groupby(user) + vectorized cumsum inside the group — the
    bounded-group caveat and bucketed escape are sessionize's."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def cumulate(g) -> "pa.Table":
        g = g.sort_values(["ts", "event_id"])
        micro = np.floor(g["value"].values * 1_000_000 + 0.5).astype(
            np.int64
        )
        import pandas as pd

        return pd.DataFrame(
            {
                "event_id": g["event_id"].values,
                "user_id": g["user_id"].values,
                "seq": np.arange(1, len(g) + 1, dtype=np.int64),
                "cum_value_micro": np.cumsum(micro),
            }
        )

    return ds.groupby("user_id").map_groups(cumulate,
                                            batch_format="pandas")


def q_key_skew(sf_dir: str):
    """Shuffle-key skew audit (the pre-flight check before keying a
    100 TB groupby on user_id): row count, distinct keys, the heaviest
    key and its share in integer PPM. Per-batch partial counts -> one
    counter groupby -> per-block partial top-1 reduce; totals read off
    the materialized counter table."""
    ds = _read(sf_dir, "events", ["user_id"])

    def partials(t: pa.Table) -> pa.Table:
        part = t.group_by("user_id").aggregate([([], "count_all")])
        return part.rename_columns(["user_id", "n"])

    counts = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {"user_id": t["user_id"], "n": pc.cast(t["n"], pa.int64())}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .materialize()
    )
    n_rows = int(counts.sum("n"))
    n_keys = counts.count()
    from ..stages.topk import dataset_topk

    top = dataset_topk(
        counts, [("n", "descending"), ("user_id", "ascending")], 1
    ).take(1)[0]
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_keys": pa.array([n_keys], pa.int64()),
            "top_key": pa.array([int(top["user_id"])], pa.int64()),
            "top_n": pa.array([int(top["n"])], pa.int64()),
            "top_share_ppm": pa.array(
                [int(top["n"]) * 1_000_000 // n_rows if n_rows else 0],
                pa.int64(),
            ),
        }
    )


def q_orders_without_lineitems(sf_dir: str):
    """Anti-join (the find-the-unmatched relational primitive — Ray
    Data's ``left_anti`` join type): orders with no lineitems — the
    referential-integrity audit. The probe side pre-dedups to distinct
    keys per batch so only distinct order keys cross the wire; the
    typed-empty union pins the output schema even when the audit comes
    back clean (an empty Dataset otherwise loses its schema)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    items = _read(sf_dir, "lineitem", ["l_orderkey"])

    def distinct_keys(t: pa.Table) -> pa.Table:
        return t.group_by("l_orderkey").aggregate([])

    probe = items.map_batches(distinct_keys, batch_format="pyarrow",
                              zero_copy_batch=True)
    nparts = dd.adaptive_partitions(50_000)
    out = sj.safe_join(orders, probe, join_type="left_anti",
                       num_partitions=nparts,
                       on=("o_orderkey",), right_on=("l_orderkey",))
    empty = rd.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
            }
        )
    )
    return out.union(empty)


def q_global_quantiles(sf_dir: str):
    """Exact GLOBAL quantiles without a global sort (the
    histogram-of-values trick): per-batch partial (value, n) counts ->
    one counter groupby (O(distinct values) rows) -> the tiny histogram
    cumsums on the driver and reads the order statistics at
    floor((n-1)q). A range-shuffle sort of the corpus for three scalars
    is the canonical all-to-all to AVOID; this plan's shuffle volume is
    the value domain, not the row count."""
    ds = _read(sf_dir, "documents", ["n_chars"])

    def partials(t: pa.Table) -> pa.Table:
        part = t.group_by("n_chars").aggregate([([], "count_all")])
        return part.rename_columns(["n_chars", "n"])

    hist = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct values) — the histogram, not the data
        .sort_values("n_chars")
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])

    def at(q_num: int, q_den: int) -> int:
        idx = ((n - 1) * q_num) // q_den  # 0-based order statistic
        return int(vals[np.searchsorted(cum, idx + 1, side="left")])

    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "p50_chars": pa.array([at(1, 2)], pa.int64()),
            "p90_chars": pa.array([at(9, 10)], pa.int64()),
            "p99_chars": pa.array([at(99, 100)], pa.int64()),
        }
    )


def q_winsorize(sf_dir: str):
    """Winsorization at the exact global p01/p99 (the outlier-robust
    length normalizer a feature pipeline applies before scaling):
    reuses the histogram-of-values order-statistic plan above to get
    BOTH cut points in one tiny counter groupby — the shuffle is the
    value domain, never the rows — then one stateless clip map over the
    corpus with the two scalars as closure constants. 0-based order
    statistic floor((n-1)q) on both sides, so the oracle's window
    row_number replay is bit-identical."""
    ds = _read(sf_dir, "documents", ["n_chars"])

    def partials(t: pa.Table) -> pa.Table:
        part = t.group_by("n_chars").aggregate([([], "count_all")])
        return part.rename_columns(["n_chars", "n"])

    hist = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("n_chars")
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])

    def at(q_num: int, q_den: int) -> int:
        idx = ((n - 1) * q_num) // q_den
        return int(vals[np.searchsorted(cum, idx + 1, side="left")])

    lo, hi = at(1, 100), at(99, 100)

    def clip(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False)
        c = np.clip(x, lo, hi)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "clipped": pa.array(c.astype(np.int64)),
                "was_clipped": pa.array((x < lo) | (x > hi)),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        clip, batch_format="pyarrow", zero_copy_batch=True
    )


RFM_DAY_US = 86_400_000_000  # integer day arithmetic, no date_diff semantics


def _hist_order_stat(ds, col: str):
    """The histogram-of-values order-statistic plan (q_global_quantiles)
    packaged for reuse: returns (n, at(q_num, q_den)) where at() reads
    the exact 0-based order statistic floor((n-1)q) from the tiny
    (value, count) histogram. Shuffle volume = the value domain."""

    def partials(t: pa.Table) -> pa.Table:
        part = t.group_by(col).aggregate([([], "count_all")])
        return part.rename_columns([col, "n"])

    hist = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(col)
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct values) — the histogram, not the data
        .sort_values(col)
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    vals = hist[col].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0

    def at(q_num: int, q_den: int) -> int:
        idx = ((n - 1) * q_num) // q_den
        return int(vals[np.searchsorted(cum, idx + 1, side="left")])

    return n, at


def q_user_rfm(sf_dir: str):
    """RFM segmentation over the event stream (recency / frequency /
    monetary — the classic behavioral-cohort tiering): one groupby(user)
    folds events into (last-seen, count, money) — integer day and cent
    arithmetic throughout (epoch-us // day; floor(value*100 + 0.5), an
    integer sum that no float accumulation order can perturb) — then the
    exact quartile cut points of each metric come from three
    histogram-of-values order-statistic plans over the USER table (the
    q_global_quantiles shape; shuffle volume = value domains, never
    rows), and a stateless map scores users 1-4 per metric. Quartile
    convention: score = 1 + #thresholds strictly below the value, so
    ties at a cut point share the lower tier on both engines."""
    import datetime as _dtm

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    # exact integer epoch-us (timedelta floor-div; no float .timestamp())
    ref_us = (
        ev.max("ts") - _dtm.datetime(1970, 1, 1)
    ) // _dtm.timedelta(microseconds=1)

    def fold(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(t["value"], pa.scalar(100.0)),
                       pa.scalar(0.5))
            ),
            pa.int64(),
        )
        part = pa.table(
            {"user_id": t["user_id"], "us": us, "cents": cents}
        ).group_by("user_id").aggregate(
            [("us", "max"), ("cents", "sum"), ("us", "count")]
        )
        return part.rename_columns(["user_id", "us_max", "cents", "n"])

    users = (
        ev.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            ray.data.aggregate.Max("us_max", alias_name="us_max"),
            ray.data.aggregate.Sum("cents", alias_name="m_cents"),
            ray.data.aggregate.Sum("n", alias_name="f_n"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "user_id": t["user_id"],
                    "r_days": pc.divide(
                        pc.subtract(pa.scalar(ref_us, pa.int64()),
                                    t["us_max"]),
                        pa.scalar(RFM_DAY_US, pa.int64()),
                    ),
                    "f_n": pc.cast(t["f_n"], pa.int64()),
                    "m_cents": pc.cast(t["m_cents"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # three histogram plans + the score map read it
    )
    cuts: dict[str, tuple[int, int, int]] = {}
    for col in ("r_days", "f_n", "m_cents"):
        _, at = _hist_order_stat(users.select_columns([col]), col)
        cuts[col] = (at(1, 4), at(2, 4), at(3, 4))

    def score(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in ("user_id", "r_days", "f_n", "m_cents")}
        for col, short in (("r_days", "r"), ("f_n", "f"),
                           ("m_cents", "m")):
            v = t[col].to_numpy(zero_copy_only=False)
            q1, q2, q3 = cuts[col]
            s = 1 + (v > q1).astype(np.int64) + (v > q2) + (v > q3)
            out[f"{short}_score"] = pa.array(s, pa.int64())
        return pa.table(out)

    return users.map_batches(score, batch_format="pyarrow")


# the \S+ runs of stages/text.TOKEN_PATTERN, compiled once at import
_WS_TOKEN_RE = re.compile(tx.TOKEN_PATTERN)


def q_lexical_diversity(sf_dir: str):
    """Type-token ratio per document (integer PPM) — the lexical-
    diversity quality signal (word-salad spam and template boilerplate
    both collapse TTR). Tokens are the \\S+ runs shared with the
    token_count oracle; types are exact distinct tokens per doc.
    Embarrassingly parallel — a document is one row, no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        ids, n_t, n_y, ppm = [], [], [], []
        for did, s in zip(t["doc_id"].to_pylist(),
                          t["text"].to_pylist()):
            toks = _WS_TOKEN_RE.findall(s or "")
            if not toks:
                continue
            ids.append(did)
            n_t.append(len(toks))
            n_y.append(len(set(toks)))
            ppm.append(len(set(toks)) * 1_000_000 // len(toks))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_t, pa.int64()),
                "n_types": pa.array(n_y, pa.int64()),
                "ttr_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_hapax_rate(sf_dir: str):
    """Hapax-legomenon rate per source (share of the source's vocabulary
    that occurs exactly once — the vocabulary-freshness / OCR-noise
    audit; Zipf predicts ~50% for natural text, template spam collapses
    it). Two counter shuffles: per-batch (source, word) partial counts
    -> groupby sum (the exact corpus term frequency), then per-batch
    (source, is-hapax) partials -> groupby source. Word text never
    leaves the first shuffle; the second moves two counters per
    source."""

    def partials(t: pa.Table) -> pa.Table:
        agg: Counter = Counter()
        for src, s in zip(t["source"].to_pylist(),
                          t["text"].to_pylist()):
            for w in _WS_TOKEN_RE.findall(s or ""):
                agg[(src, w)] += 1
        return pa.table(
            {
                "source": pa.array([k[0] for k in agg], pa.string()),
                "word": pa.array([k[1] for k in agg], pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    tf = (
        _read(sf_dir, "documents", ["source", "text"])
        .map_batches(partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["source", "word"])
        .sum("n")
    )

    def fold(t: pa.Table) -> pa.Table:
        part = pa.table(
            {
                "source": t["source"],
                "v": pa.array(np.ones(t.num_rows, np.int64)),
                "h": pc.cast(
                    pc.equal(t["sum(n)"], pa.scalar(1, pa.int64())),
                    pa.int64(),
                ),
            }
        ).group_by("source").aggregate([("v", "sum"), ("h", "sum")])
        return part.rename_columns(["source", "v", "h"])

    return (
        tf.map_batches(fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("v", alias_name="n_vocab"),
            ray.data.aggregate.Sum("h", alias_name="n_hapax"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "source": t["source"],
                    "n_vocab": pc.cast(t["n_vocab"], pa.int64()),
                    "n_hapax": pc.cast(t["n_hapax"], pa.int64()),
                    "hapax_ppm": pc.divide(
                        pc.multiply(
                            pc.cast(t["n_hapax"], pa.int64()),
                            pa.scalar(1_000_000, pa.int64()),
                        ),
                        pc.cast(t["n_vocab"], pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


HASH_FEATURE_BUCKETS = 64


def q_hash_features(sf_dir: str):
    """Feature hashing (the fastText-style fixed-width featurizer):
    char-trigrams of the raw text hashed into 64 buckets (md5 mod 64,
    SQL-replayable), emitted as sparse (doc_id, bucket, n) rows. NO
    shuffle at all: a document is one row, so per-batch counts are
    final — the map is the whole plan, embarrassingly parallel at any
    corpus size."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        d_out: list[int] = []
        b_out: list[int] = []
        n_out: list[int] = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = s or ""
            agg: dict[int, int] = {}
            for i in range(len(s) - 2):
                h = int.from_bytes(
                    hashlib.md5(s[i:i + 3].encode("utf-8")).digest()[:4],
                    "big",
                ) % HASH_FEATURE_BUCKETS
                agg[h] = agg.get(h, 0) + 1
            for b, n in agg.items():
                d_out.append(did)
                b_out.append(b)
                n_out.append(n)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "bucket": pa.array(b_out, pa.int64()),
                "n": pa.array(n_out, pa.int64()),
            }
        )

    return docs.map_batches(feats, batch_format="pyarrow",
                            zero_copy_batch=True)


LOGIT_WEIGHT_SPAN = 1_000_001  # weights land in [-500000, 500000]


@functools.lru_cache(maxsize=1)
def _logit_weights() -> dict[int, int]:
    """Deterministic per-bucket weights for the linear quality scorer:
    md5(bucket) first 4 bytes mod the span, recentred — the stand-in for
    trained fastText weights (no network / no training data here), fully
    integer so both engines hash-match exactly."""
    return {
        b: int.from_bytes(
            hashlib.md5(str(b).encode("utf-8")).digest()[:4], "big"
        )
        % LOGIT_WEIGHT_SPAN
        - 500_000
        for b in range(HASH_FEATURE_BUCKETS)
    }


def q_quality_logit(sf_dir: str):
    """Model-based quality filter (the DCLM/fastText-style linear
    classifier pass — the other half of quality filtering next to the
    rule-based gopher/c4 signals): hash char-trigrams into 64 buckets
    (q_hash_features' featurizer), dot the count vector with a fixed
    integer weight table, normalize by total trigram count with
    TRUNCATING integer division (DuckDB's ``//`` truncates toward zero;
    Python's floors — mimicked explicitly), and keep docs with positive
    logit. All-integer arithmetic, so the oracle is hash-exact. NO
    shuffle: a doc is one row, per-batch scores are final; the weight
    table is 64 ints compiled once per process."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    W = _logit_weights()

    def score(t: pa.Table) -> pa.Table:
        d_out, l_out, k_out = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = s or ""
            agg: dict[int, int] = {}
            for i in range(len(s) - 2):
                h = int.from_bytes(
                    hashlib.md5(s[i : i + 3].encode("utf-8")).digest()[:4],
                    "big",
                ) % HASH_FEATURE_BUCKETS
                agg[h] = agg.get(h, 0) + 1
            total = sum(agg.values())
            raw = sum(n * W[b] for b, n in agg.items())
            if total:
                q_, r_ = divmod(abs(raw), total)
                logit = q_ if raw >= 0 else -q_
            else:
                logit = 0
            d_out.append(did)
            l_out.append(logit)
            k_out.append(1 if logit > 0 else 0)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "logit_ppm": pa.array(l_out, pa.int64()),
                "keep": pa.array(k_out, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_filter_agreement(sf_dir: str):
    """Filter-agreement matrix (the audit run before swapping quality
    filters: how often does the model-based logit filter agree with the
    rule-based Gopher tiers?): ONE fused pass computes both signals per
    doc — tier via the shared word-stats/tier kernels, keep via the
    hashed-feature logit — then per-batch (tier, keep) counter partials
    feed a 6-row groupby. No corpus-row shuffle, no join: both signals
    derive from the same row. Docs with zero words carry no tier and are
    excluded on both sides (word_stats_batch drops them; the oracle's
    tier CTE never emits them)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_total = _table_rows(sf_dir, "documents")
    W = _logit_weights()

    def f(t: pa.Table) -> pa.Table:
        keeps: dict[int, int] = {}
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = s or ""
            agg: dict[int, int] = {}
            for i in range(len(s) - 2):
                h = int.from_bytes(
                    hashlib.md5(s[i : i + 3].encode("utf-8")).digest()[:4],
                    "big",
                ) % HASH_FEATURE_BUCKETS
                agg[h] = agg.get(h, 0) + 1
            total = sum(agg.values())
            raw = sum(n * W[b] for b, n in agg.items())
            logit = (abs(raw) // total) * (1 if raw >= 0 else -1) \
                if total else 0
            keeps[did] = 1 if logit > 0 else 0
        tiers = tx.quality_tier_batch(tx.word_stats_batch(t))
        part = pa.table(
            {
                "tier": tiers["tier"],
                "keep": pa.array(
                    [keeps[d] for d in tiers["doc_id"].to_pylist()],
                    pa.int64(),
                ),
            }
        ).group_by(["tier", "keep"]).aggregate([([], "count_all")])
        return part.rename_columns(["tier", "keep", "n"])

    agg = (
        docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["tier", "keep"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n_docs"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "tier": t["tier"],
                "keep": pc.cast(t["keep"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "share_ppm": pc.divide(
                    pc.multiply(
                        pc.cast(t["n_docs"], pa.int64()),
                        pa.scalar(1_000_000, pa.int64()),
                    ),
                    pa.scalar(max(n_total, 1), pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_split_token_budget(sf_dir: str):
    """Per-split token accounting (the budget sheet of a training-data
    build: how many tokens actually land in train/valid/test): split
    assignment and token count both derive from the row, so ONE fused
    map emits per-batch per-split (n_docs, n_tokens) partials into a
    3-row groupby — no join, no corpus shuffle. Shares are integer PPM
    of the corpus token total (read off the materialized 3-row
    aggregate, not a second pass)."""
    import hashlib as _hl

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        buckets = [
            int(_hl.md5(str(i).encode()).hexdigest()[:15], 16)
            % SPLIT_BUCKETS
            for i in ids
        ]
        splits = [
            "train" if b < SPLIT_TRAIN else "valid" if b < SPLIT_VALID
            else "test"
            for b in buckets
        ]
        toks = pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
        )
        part = pa.table(
            {
                "split": pa.array(splits, pa.string()),
                "one": pa.array([1] * len(ids), pa.int64()),
                "toks": toks,
            }
        ).group_by("split").aggregate([("one", "sum"), ("toks", "sum")])
        return part.rename_columns(["split", "n_docs", "n_tokens"])

    agg = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("split")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("n_tokens", alias_name="n_tokens"),
        )
        .materialize()  # exactly <=3 rows
    )
    total_toks = int(agg.sum("n_tokens") or 0)
    return agg.map_batches(
        lambda t: pa.table(
            {
                "split": t["split"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
                "token_share_ppm": pc.divide(
                    pc.multiply(
                        pc.cast(t["n_tokens"], pa.int64()),
                        pa.scalar(1_000_000, pa.int64()),
                    ),
                    pa.scalar(max(total_toks, 1), pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


REDIR_BLOCK = 8  # ids at multiples of 8 are terminal; chains <= 7 hops
REDIR_ROUNDS = 3  # pointer doubling: 2^3 = 8 >= max chain length


def q_redirects(sf_dir: str):
    """Redirect-chain resolution by POINTER DOUBLING (the CDX/crawl-time
    canonicalization step: every captured URL resolves to its terminal
    target): the fixture derives one redirect edge per doc
    (``i -> i-1`` unless ``i`` is a block terminal), then each round
    composes the pointer map with itself through a hash join —
    ``(id, nxt, hops) ⋈ (nxt = id')`` — so after r rounds every pointer
    covers 2^r hops. log2(max-chain) JOIN rounds instead of max-chain
    sequential walks: the web's redirect chains are short (<10), so 3-4
    rounds resolve 10^12 urls with each round a plain O(n) hash join on
    the id key. Terminals self-loop with hops=0, which makes the
    composition idempotent at the fixpoint. Output: (url, final_url,
    hops); the oracle replays the walk with a recursive CTE."""
    ids = _read(sf_dir, "documents", ["doc_id"])

    def init_map(t: pa.Table) -> pa.Table:
        i = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        term = i % REDIR_BLOCK == 0
        nxt = np.where(term, i, i - 1)
        hops = np.where(term, 0, 1).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(i, pa.int64()),
                "nxt": pa.array(nxt, pa.int64()),
                "hops": pa.array(hops, pa.int64()),
            }
        )

    m = ids.map_batches(init_map, batch_format="pyarrow",
                        zero_copy_batch=True)
    nparts = dd.adaptive_partitions(_table_rows(sf_dir, "documents"))
    for _ in range(REDIR_ROUNDS):
        right = m.select_columns(["id", "nxt", "hops"])
        m = (
            sj.safe_join(
                m, right,
                join_type="inner",
                num_partitions=nparts,
                on=("nxt",),
                right_on=("id",),
                right_suffix="_r",
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "id": t["id"],
                        "nxt": t["nxt_r"],
                        "hops": pc.add(t["hops"], t["hops_r"]),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()  # pin each doubling round (join inputs reused)
        )

    def finish(t: pa.Table) -> pa.Table:
        urls = [f"https://r.example/p{i}" for i in t["id"].to_pylist()]
        finals = [f"https://r.example/p{i}" for i in t["nxt"].to_pylist()]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "final_url": pa.array(finals, pa.string()),
                "hops": pc.cast(t["hops"], pa.int64()),
            }
        )

    return m.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


SKEW_DIM = 50  # dim-table cardinality for the skewed-join fixture


def q_join_skewed(sf_dir: str):
    """Hot-key join via explicit salting (the straggler-killer for the
    empty-referrer/boilerplate-key joins a web corpus always has): the
    fixture key sends ~75% of events to key 0; ``detect_hot_keys`` (one
    counter pass, rows never move) finds it, ``salted_join`` fans the
    hot key over 8 salt sub-partitions while replicating the matching
    thin-side rows 8 ways, and the whole thing runs as ONE uniform
    (key, salt) hash join — identical result set to the plain join (the
    oracle IS the plain SQL join), without the unbounded single-
    partition straggler. Values ride as integer micro-units (no
    float-sum-order hazard)."""
    from ..stages import joins as js

    ev = _read(sf_dir, "events", ["event_id", "value"])

    def derive(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["event_id"].to_pylist(), dtype=np.int64)
        k = np.where(eid % 4 != 0, 0, eid % SKEW_DIM)
        micro = np.floor(
            np.asarray(t["value"].to_pylist(), dtype=np.float64) * 1_000_000
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "k": pa.array(k, pa.int64()),
                "micro": pa.array(micro, pa.int64()),
            }
        )

    fat = ev.map_batches(derive, batch_format="pyarrow",
                         zero_copy_batch=True)
    dim = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(range(SKEW_DIM), pa.int64()),
                "mult": pa.array(
                    [(k * 7) % 13 + 1 for k in range(SKEW_DIM)], pa.int64()
                ),
            }
        )
    )
    hot = js.detect_hot_keys(fat, "k")
    joined = js.salted_join(
        fat, dim, on="k", salt_col="event_id", hot_keys=hot, salt=8,
        num_partitions=dd.adaptive_partitions(_table_rows(sf_dir, "events")),
    )

    def partial(t: pa.Table) -> pa.Table:
        w = pc.multiply(t["micro"], t["mult"])
        part = (
            pa.table(
                {
                    "k": t["k"],
                    "one": pa.array([1] * t.num_rows, pa.int64()),
                    "w": w,
                }
            )
            .group_by("k")
            .aggregate([("one", "sum"), ("w", "sum")])
        )
        return part.rename_columns(["k", "n", "w"])

    return (
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("k")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n_events"),
            ray.data.aggregate.Sum("w", alias_name="weighted_micro"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "k": pc.cast(t["k"], pa.int64()),
                    "n_events": pc.cast(t["n_events"], pa.int64()),
                    "weighted_micro": pc.cast(
                        t["weighted_micro"], pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def q_dau(sf_dir: str):
    """Daily active users with the new-vs-returning split (the growth
    dashboard op): distinct (user, day) activity, per-user first day
    from one groupby(user), then per-day counter sums. Day keys ride
    the shuffles as int64 epoch days and convert back at the edge."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64()),
            pa.scalar(DAY_US, pa.int64()),
        )
        return (
            pa.table({"user_id": t["user_id"], "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    def per_user(g: pa.Table) -> pa.Table:
        days = np.unique(np.asarray(g["day"].to_pylist(), dtype=np.int64))
        return pa.table(
            {
                "day": pa.array(days, pa.int64()),
                "active": pa.array(np.ones(len(days), np.int64)),
                "new": pa.array(
                    (days == days[0]).astype(np.int64), pa.int64()
                ),
            }
        )

    def partials(t: pa.Table) -> pa.Table:
        part = t.group_by("day").aggregate(
            [("active", "sum"), ("new", "sum")]
        )
        return part.rename_columns(["day", "active", "new"])

    agg = (
        ds.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .map_batches(partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("day")
        .aggregate(
            ray.data.aggregate.Sum("active", alias_name="n_active"),
            ray.data.aggregate.Sum("new", alias_name="n_new"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "day": pc.cast(
                    pc.multiply(t["day"], pa.scalar(DAY_US, pa.int64())),
                    pa.timestamp("us"),
                ),
                "n_active": pc.cast(t["n_active"], pa.int64()),
                "n_new": pc.cast(t["n_new"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


COCITE_MIN_COMMON = 2


def q_cocitation(sf_dir: str):
    """Co-citation similarity over the link graph (Small 1973 — pages
    repeatedly linked FROM the same pages are related; the structural
    related-pages signal that needs no text): distinct directed edges,
    self-join on the citing page, per-pair count of common citers plus
    an inverse-outdegree weight sum in integer PPM (the Adamic-Adar
    shape with 1e6//outdeg instead of 1/log — exact on both engines).
    Fan-out is outdeg^2 per citing page — bounded by page design (a
    page links to tens of targets); a mega-outdegree page (link farm)
    should be capped/sampled before the self-join at open-web scale,
    the same guard as LSH's bucket_pairs."""
    pages_dir = link_corpus()
    e = _outlinks_ds(pages_dir)

    def dedup_batch(t: pa.Table) -> pa.Table:
        return t.group_by(["src", "dst"]).aggregate([])

    d = (
        e.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(ray.data.aggregate.Count(alias_name="_n"))
        .select_columns(["src", "dst"])
        .materialize()
    )

    def outdeg_partial(t: pa.Table) -> pa.Table:
        part = t.select(["src"]).group_by("src").aggregate(
            [([], "count_all")]
        )
        return part.rename_columns(["src", "deg"])

    deg = (
        d.map_batches(outdeg_partial, batch_format="pyarrow",
                      zero_copy_batch=True)
        .groupby("src")
        .aggregate(ray.data.aggregate.Sum("deg", alias_name="deg"))
    )
    nparts = dd.adaptive_partitions(LINK_N)
    dw = sj.safe_join(d, deg, join_type="inner",
                      num_partitions=nparts,
                      on=("src",)).materialize()
    pairs = sj.safe_join(dw, dw.select_columns(["src", "dst"]),
                         join_type="inner", num_partitions=nparts,
                         on=("src",), right_suffix="_2")

    def score_partial(t: pa.Table) -> pa.Table:
        keep = pc.less(t["dst"], t["dst_2"])
        t = t.filter(keep)
        w = pc.divide(pa.scalar(1_000_000, pa.int64()),
                      pc.cast(t["deg"], pa.int64()))
        aug = pa.table(
            {
                "a": t["dst"],
                "b": t["dst_2"],
                "n": pa.array([1] * t.num_rows, pa.int64()),
                "w": w,
            }
        )
        part = aug.group_by(["a", "b"]).aggregate(
            [("n", "sum"), ("w", "sum")]
        )
        return part.rename_columns(["a", "b", "n", "w"])

    agg = (
        pairs.map_batches(score_partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n_common"),
            ray.data.aggregate.Sum("w", alias_name="aa_ppm"),
        )
    )
    return agg.filter(
        expr=f"n_common >= {COCITE_MIN_COMMON}"
    ).map_batches(
        lambda t: pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "n_common": pc.cast(t["n_common"], pa.int64()),
                "aa_ppm": pc.cast(t["aa_ppm"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_vocab_coverage(sf_dir: str):
    """Tokenizer-vocab coverage audit (the OOV-rate check before
    committing a vocab): what fraction of corpus token OCCURRENCES the
    top-K vocabulary covers, in integer PPM. Reuses the term-count
    table for BOTH totals — in-vocab mass is the sum of the top-K
    counts themselves, so there is no second pass over the text and
    the count table is never driver-materialized (per-block top-K
    partials + sums)."""

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for s in t["text"].to_pylist():
            for w in (s or "").split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    from ..stages.topk import dataset_topk

    counts = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
        .materialize()
    )
    n_tokens = int(counts.sum("n"))
    top = dataset_topk(
        counts, [("n", "descending"), ("term", "ascending")], VOCAB_TOP_K
    ).materialize()
    n_in = int(top.sum("n"))
    return pa.table(
        {
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "n_in_vocab": pa.array([n_in], pa.int64()),
            "vocab_size": pa.array([top.count()], pa.int64()),
            "coverage_ppm": pa.array(
                [n_in * 1_000_000 // n_tokens if n_tokens else 0],
                pa.int64(),
            ),
        }
    )


MOJIBAKE_MARKERS = ["Ã", "â€", "Â"]  # double-decoded UTF-8 tell-tales


def q_mojibake(sf_dir: str):
    """Encoding-damage audit (the ftfy-style mojibake scan a web corpus
    needs before training): count tell-tale double-decoded UTF-8
    sequences (Ã., â€., Â.) per page with vectorized substring-count
    kernels and flag damaged docs. The fixture page injects a
    deterministic amount of mojibake per doc_id (the raw fixture text is
    clean), mirrored by the oracle's ``repeat``; marker counting is three
    ``pc.count_substring`` kernels — no regex, no Python loop. At 100 TB
    this is a stateless single-pass map; the damaged-share rollup is a
    two-int aggregate."""

    def f(t: pa.Table) -> pa.Table:
        pages = pa.array(
            [
                f"{txt} " + "Ã©â€™Â« " * (did % 3)
                for txt, did in zip(
                    t["text"].to_pylist(), t["doc_id"].to_pylist()
                )
            ],
            pa.string(),
        )
        n = None
        for m in MOJIBAKE_MARKERS:
            c = pc.cast(pc.count_substring(pages, m), pa.int64())
            n = c if n is None else pc.add(n, c)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_mojibake": n,
                "damaged": pc.cast(
                    pc.greater(n, pa.scalar(0, pa.int64())), pa.int64()
                ),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_tokenizer_fertility(sf_dir: str):
    """Tokenizer fertility per language (subword tokens per whitespace
    word, integer PPM — the tokenizer-eval metric that decides whether a
    vocab under-serves a language): two vectorized RE2 counts per batch
    (words = ``\\S+`` runs, subwords = a GPT-2-ish letter/digit/symbol
    split), per-batch partial sums per lang, then a languages-sized
    groupby — the shuffle moves O(langs × read-parallelism) rows, never
    text."""

    def partial(t: pa.Table) -> pa.Table:
        w = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        s = pc.cast(
            pc.count_substring_regex(
                t["text"], r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
            ),
            pa.int64(),
        )
        part = pa.table(
            {"lang": t["lang"], "w": w, "s": s}
        ).group_by("lang").aggregate([("w", "sum"), ("s", "sum")])
        return part.rename_columns(["lang", "w", "s"])

    agg = (
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("w", alias_name="n_words"),
            ray.data.aggregate.Sum("s", alias_name="n_subtokens"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        w = pc.cast(t["n_words"], pa.int64())
        s = pc.cast(t["n_subtokens"], pa.int64())
        ppm = pc.divide(
            pc.multiply(s, pa.scalar(1_000_000, pa.int64())),
            pc.max_element_wise(w, pa.scalar(1, pa.int64())),
        )
        return pa.table(
            {
                "lang": t["lang"],
                "n_words": w,
                "n_subtokens": s,
                "fertility_ppm": ppm,
            }
        )

    return agg.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    )


def q_dup_cluster_sizes(sf_dir: str):
    """Near-dup cluster size distribution (the dedup audit every corpus
    report carries: how much of the corpus sits in 2-doc pairs vs giant
    boilerplate blobs): the verified LSH cluster chain -> per-cluster
    member count -> histogram of cluster sizes. Reuses the whole
    distributed clusters dataflow; both rollups shuffle O(clusters) then
    O(distinct sizes) rows."""
    comp = q_dedup_minhash_clusters(sf_dir)
    sizes = comp.groupby("rep_id").aggregate(
        ray.data.aggregate.Count(alias_name="n_members")
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        part = (
            t.select(["n_members"])
            .group_by("n_members")
            .aggregate([([], "count_all"), ("n_members", "sum")])
        )
        return part.rename_columns(["cluster_size", "n_clusters", "n_docs"])

    return (
        sizes.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cluster_size")
        .aggregate(
            ray.data.aggregate.Sum("n_clusters", alias_name="n_clusters"),
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "cluster_size": pc.cast(t["cluster_size"], pa.int64()),
                    "n_clusters": pc.cast(t["n_clusters"], pa.int64()),
                    "n_docs": pc.cast(t["n_docs"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


KMEANS_K = 8
KMEANS_ITERS = 2  # pinned: the SQL oracle unrolls exactly two rounds
CLUSTER_SAMPLE_Q = 20  # kept rows per cluster in q_cluster_sample


def _kmeans_assign(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """The shared determinism recipe (knn_brute's): Euclidean distance
    rounded to 4 dp, argmin with first-lowest-cluster tie-break."""
    d = np.round(
        np.sqrt(((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)), 4
    )
    return d.argmin(axis=1)


def _kmeans_fit(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Distributed Lloyd loop shared by q_kmeans / q_cluster_sample:
    returns (centroids rounded to 6 dp, member counts of the final
    assignment). Per iteration, the K rounded centroids broadcast into
    a stateless assignment map, each batch pre-aggregates
    (cluster, vector-sum, count) partials, and the driver reduces K tiny
    rows — shuffle volume O(K × read-parallelism), driver state K×D
    floats, both corpus-size-independent. Deterministic init: the K
    lowest-vec_id embeddings (read via parquet batch iteration, never a
    full-column load)."""
    import pyarrow.parquet as pq_

    path = _pq(sf_dir, "embeddings")
    pf = pq_.ParquetFile(path)
    init_rows: list = []
    for b in pf.iter_batches(batch_size=4096, columns=["vec_id", "embedding"]):
        init_rows.append(b)
        if sum(x.num_rows for x in init_rows) >= KMEANS_K:
            break
    head = pa.Table.from_batches(init_rows).sort_by("vec_id")
    C = np.asarray(
        head["embedding"].to_pylist()[:KMEANS_K], dtype=np.float64
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def make_partial(cents: np.ndarray):
        def partial(t: pa.Table) -> pa.Table:
            X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
            assign = _kmeans_assign(X, cents)
            out_c, out_s, out_n = [], [], []
            for k in np.unique(assign):
                m = assign == k
                out_c.append(int(k))
                out_s.append(X[m].sum(axis=0).tolist())
                out_n.append(int(m.sum()))
            return pa.table(
                {
                    "cluster": pa.array(out_c, pa.int64()),
                    "vsum": pa.array(out_s, pa.list_(pa.float64())),
                    "n": pa.array(out_n, pa.int64()),
                }
            )

        return partial

    n_members = np.zeros(KMEANS_K, dtype=np.int64)
    for _ in range(KMEANS_ITERS):
        parts = (
            ds.map_batches(
                make_partial(C), batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("cluster")
            .map_groups(
                lambda g: pa.table(
                    {
                        "cluster": g["cluster"][:1],
                        "vsum": pa.array(
                            [
                                np.asarray(
                                    g["vsum"].to_pylist(), dtype=np.float64
                                )
                                .sum(axis=0)
                                .tolist()
                            ],
                            pa.list_(pa.float64()),
                        ),
                        "n": pa.array(
                            [int(pc.sum(g["n"]).as_py())], pa.int64()
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .take_all()  # exactly K tiny rows
        )
        newC = C.copy()
        n_members[:] = 0
        for r in parts:
            k = int(r["cluster"])
            n = int(r["n"])
            n_members[k] = n
            if n:
                newC[k] = np.round(
                    np.asarray(r["vsum"], dtype=np.float64) / n, 6
                )
        C = newC
    return C, n_members


def q_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over the embedding column (the corpus
    clustering behind SemDeDup / cluster-balanced sampling) — the one
    ITERATIVE dataflow in the family; see ``_kmeans_fit`` for the plan
    shape. Centroids round to 6 dp each update so both engines iterate
    on identical values; the oracle unrolls the two Lloyd rounds in SQL.
    Output: final centroids (long form) + member counts of the
    converged assignment."""
    C, n_members = _kmeans_fit(sf_dir)

    rows_c, rows_p, rows_v, rows_n = [], [], [], []
    for k in range(KMEANS_K):
        for p in range(C.shape[1]):
            rows_c.append(k)
            rows_p.append(p + 1)
            rows_v.append(float(C[k, p]))
            rows_n.append(int(n_members[k]))
    return pa.table(
        {
            "cluster": pa.array(rows_c, pa.int64()),
            "pos": pa.array(rows_p, pa.int64()),
            "value": pa.array(rows_v, pa.float64()),
            "n_members": pa.array(rows_n, pa.int64()),
        }
    )


def q_cluster_sample(sf_dir: str):
    """Cluster-balanced diversity sample (the SemDeDup-era curation
    move: sample evenly across embedding-space clusters instead of
    uniformly, so head clusters can't drown the tail): fit k-means
    (``_kmeans_fit``), one stateless assignment pass with the broadcast
    final centroids, then keep the ``CLUSTER_SAMPLE_Q`` rows with the
    smallest md5(vec_id) hash rank per cluster — the deterministic,
    order-free, restart-stable sampling idiom shared with
    sample_reservoir. Per-batch per-cluster top-Q partials pre-prune
    before the shuffle, so the groupby moves ≤ Q × K × blocks rows."""
    C, _ = _kmeans_fit(sf_dir)

    def assign_rank(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        assign = _kmeans_assign(X, C)
        rks = [
            hashlib.md5(str(v).encode("utf-8")).hexdigest()
            for v in t["vec_id"].to_pylist()
        ]
        out = pa.table(
            {
                "cluster": pa.array(assign, pa.int64()),
                "vec_id": t["vec_id"],
                "rk": pa.array(rks, pa.string()),
            }
        )
        # per-batch per-cluster top-Q prune (a cluster's global top-Q is
        # a subset of the union of its per-batch top-Qs)
        out = out.take(
            pc.sort_indices(
                out, sort_keys=[("cluster", "ascending"), ("rk", "ascending")]
            )
        )
        cl = out["cluster"].to_pylist()
        keep, last, seen = [], None, 0
        for i, c in enumerate(cl):
            if c != last:
                last, seen = c, 0
            seen += 1
            if seen <= CLUSTER_SAMPLE_Q:
                keep.append(i)
        return out.take(pa.array(keep, pa.int64()))

    def final_topq(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("rk", "ascending")])
        return g.take(idx.slice(0, CLUSTER_SAMPLE_Q))

    return (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            assign_rank, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cluster")
        .map_groups(final_topq, batch_format="pyarrow")
    )


XLANG_SRC = "en"  # mined (streamed) side
XLANG_TGT = "de"  # pivot (broadcast) side — the low-resource language
XLANG_K = 4  # neighborhood size for the margin denominator
XLANG_TAU_1E4 = 1800  # keep pairs with margin*1e4 >= this (fixture median)


def q_xlang_mine(sf_dir: str):
    """Margin-based bitext mining (Artetxe & Schwenk, ACL'19 — the
    forward-margin variant): for every source-language document, find its
    best target-language match by cosine and keep the pair only when the
    best score stands out from the source doc's K-nearest target
    neighborhood (margin = sim1 - mean(top-K sims)). This is the standard
    parallel-corpus mining step of a multilingual training-data pipeline
    (LASER/CCMatrix-style).

    Scale shape: the TARGET side is the low-resource language — bounded
    by assumption (that is what makes mining against it meaningful), so
    it is collected via one filtered streaming pass (the driver never
    holds the full embedding column) and shipped to the actor pool as
    plain constructor values (restart-safe, ray#53727). The SOURCE side
    streams: one hash join to attach ``lang`` (an artifact of the fixture
    splitting documents/embeddings into two tables — a production layout
    co-locates them and the join vanishes), then a stateless matmul per
    batch. No all-to-all on similarities, no driver-side pair state.
    Determinism: sims at 4 dp scaled to int64, top-K by (sim desc, tgt_id
    asc), margin compared in exact integer arithmetic."""
    tgt_ids = [
        r["doc_id"]
        for r in _read(sf_dir, "documents", ["doc_id", "lang"])
        .filter(expr=f"lang == '{XLANG_TGT}'")
        .take_all()
    ]
    tgt_set = pa.array(sorted(tgt_ids), pa.int64())
    brows = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=tgt_set)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )
    brows.sort(key=lambda r: r["vec_id"])  # index order == tgt_id order
    b_ids = [int(r["vec_id"]) for r in brows]
    b_vecs = [list(map(float, r["embedding"])) for r in brows]

    class MarginMiner:
        def __init__(self, b_ids: list[int], b_vecs: list[list[float]],
                     k: int, tau: int):
            self.tids = np.asarray(b_ids, dtype=np.int64)
            self.Bn = sim._normalize(np.asarray(b_vecs, dtype=np.float64))
            self.k = min(k, len(b_ids))
            self.tau = tau

        def __call__(self, batch: pa.Table) -> pa.Table:
            sids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            if len(sids) == 0:
                return pa.table(
                    {
                        "src_id": pa.array([], pa.int64()),
                        "tgt_id": pa.array([], pa.int64()),
                        "sim_1e4": pa.array([], pa.int64()),
                        "margin_1e4": pa.array([], pa.int64()),
                    }
                )
            M = sim._normalize(
                np.stack(
                    [
                        np.frombuffer(b, dtype=np.float64)
                        for b in batch["emb_bytes"].to_pylist()
                    ]
                )
            )
            s4 = np.rint(
                np.round(M @ self.Bn.T, 4) * 10000
            ).astype(np.int64)  # (batch, |B|) sims at 4 dp, integer-exact
            # composite rank key: sim desc, then tgt index (== tgt_id) asc
            comp = s4 * (1 << 40) - np.arange(s4.shape[1], dtype=np.int64)
            kk = self.k
            top = np.argpartition(comp, -kk, axis=1)[:, -kk:]
            rows = np.arange(len(sids))[:, None]
            tops4 = np.take_along_axis(s4, top, axis=1)
            best_j = np.take_along_axis(
                top, comp[rows, top].argmax(axis=1)[:, None], axis=1
            )[:, 0]
            best_s4 = s4[np.arange(len(sids)), best_j]
            margin = kk * best_s4 - tops4.sum(axis=1)
            keep = margin >= self.tau
            return pa.table(
                {
                    "src_id": pa.array(sids[keep], pa.int64()),
                    "tgt_id": pa.array(self.tids[best_j[keep]], pa.int64()),
                    "sim_1e4": pa.array(best_s4[keep], pa.int64()),
                    "margin_1e4": pa.array(margin[keep], pa.int64()),
                }
            )

    def pack(t: pa.Table) -> pa.Table:
        # Ray's hash join cannot carry list<float> as a non-key field;
        # pack each vector to fixed-width float64 bytes for the shuffle
        # (cheaper to move than the list representation anyway)
        vecs = t["embedding"].to_pylist()
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "emb_bytes": pa.array(
                    [np.asarray(v, dtype=np.float64).tobytes()
                     for v in vecs],
                    pa.binary(),
                ),
            }
        )

    src = (
        sj.safe_join(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(pack, batch_format="pyarrow",
                         zero_copy_batch=True),
            _read(sf_dir, "documents", ["doc_id", "lang"]).filter(
                expr=f"lang == '{XLANG_SRC}'"
            ),
            join_type="inner",
            num_partitions=dd.adaptive_partitions(
                _table_rows(sf_dir, "embeddings")
            ),
            on=("vec_id",),
            right_on=("doc_id",),
        )
    )
    return src.map_batches(
        MarginMiner, fn_constructor_args=(b_ids, b_vecs, XLANG_K,
                                          XLANG_TAU_1E4),
        batch_format="pyarrow", concurrency=_apool(),
    )


TOPIC_LEXICON = {
    # word -> topic term lists over the corpus vocabulary; a word may
    # carry several topics (e.g. 'window' is both compute and streaming)
    "compute": ["join", "sort", "merge", "hash", "group", "agg", "filter",
                "query", "order"],
    "storage": ["table", "column", "row", "scan", "part", "key", "line"],
    "streaming": ["stream", "batch", "window", "event", "spark",
                  "vector"],
}


def q_topic_tag(sf_dir: str):
    """Lexicon-based topic classification (the WebOrganizer / curated-mix
    'domain tagging' step of a training-data pipeline): count lexicon
    hits per topic over whitespace tokens, tag each doc with the argmax
    topic (ties break on topic name; zero hits => 'none'). One streaming
    pass, no shuffle; the lexicon is a constant broadcast into the batch
    fn. Output drives mixture re-weighting (see mix_rebalance)."""
    word2topics: dict[str, list[str]] = {}
    for topic, words in TOPIC_LEXICON.items():
        for w in words:
            word2topics.setdefault(w, []).append(topic)
    topics = sorted(TOPIC_LEXICON)

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out_topic, out_hits = [], []
        for txt in t["text"].to_pylist():
            counts = dict.fromkeys(topics, 0)
            for w in txt.split():
                for tp in word2topics.get(w, ()):
                    counts[tp] += 1
            # argmax with lexicographic tie-break; all-zero -> 'none'
            mx = max(counts.values())
            best = (
                min(tp for tp in topics if counts[tp] == mx)
                if mx > 0 else "none"
            )
            out_topic.append(best)
            out_hits.append(mx)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "topic": pa.array(out_topic, pa.string()),
                "hits": pa.array(out_hits, pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    )


def _distinct_pairs_min(pairs: rd.Dataset, extra: str) -> rd.Dataset:
    """Exact distinct over (a, b) keeping min(extra) — same
    salt-partition + per-partition Arrow C++ group_by shape as
    ``_distinct_pairs`` (the extra column is pair-determined, so min is
    just "keep the one value")."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(8, n_cpu * 2)

    def add_salt(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            mix = a * np.uint64(0x9E3779B97F4A7C15) ^ b
        return t.append_column(
            "p", pa.array((mix % np.uint64(n_parts)).astype(np.int64))
        )

    def dedup_part(g: pa.Table) -> pa.Table:
        r = g.select(["a", "b", extra]).group_by(["a", "b"]).aggregate(
            [(extra, "min")]
        )
        return r.rename_columns(["a", "b", extra])

    return (
        pairs
        .map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .map_groups(dedup_part, batch_format="pyarrow")
    )


def _norm_int_blocks(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Rebuild zero-schema empty blocks as typed int64 empties. Salted
    pair/distinct stages emit schemaless blocks for partitions that end
    up with no groups (rare-pair chains at larger sf), and pyarrow's
    per-partition join rejects those ("No match for FieldRef") — same
    hazard the url_templates combiner documents."""

    def f(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        return t.select(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _simhash_band_pairs(sf_dir: str) -> rd.Dataset:
    """Shared simhash near-dup pair chain: signature -> 4×16-bit band
    explode -> band groupby -> in-bucket popcount verify (Hamming <=
    SIMHASH_MAX_HAM) -> distributed distinct."""
    sigs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        dd.simhash_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "simhash"])
    bands = sigs.map_batches(
        dd.explode_simhash_bands, batch_format="pyarrow"
    )
    pairs = bands.groupby(["band_id", "band_val"]).map_groups(
        dd.simhash_bucket_pairs, batch_format="pyarrow"
    )
    return _norm_int_blocks(
        _distinct_pairs_min(pairs, "hamming"), ["a", "b", "hamming"]
    )


def q_dedup_simhash_pairs(sf_dir: str):
    """SimHash near-dup PAIRS with exact Hamming verification (Manku,
    Jain & Das Sarma, WWW'07 — Google's crawl-dedup design): 4×16-bit
    band blocking finds every pair within Hamming distance 3 by
    pigeonhole; the in-bucket popcount verify kills band false
    positives. Fully distributed (band groupby -> bucket verify ->
    salted distinct); skew-guarded against the constant-signature
    boilerplate bucket (see ``simhash_bucket_pairs``). The oracle
    replicates signature, banding, blocking and xor-popcount in SQL."""
    return _simhash_band_pairs(sf_dir)


def q_dedup_simhash_clusters(sf_dir: str):
    """Connected components over the verified simhash pair graph —
    the cluster step of Manku-style crawl dedup (one representative per
    Hamming-neighborhood). Same min-label-propagation dataflow as the
    MinHash clusters; recursive-CTE oracle."""
    return dd.connected_components(
        _simhash_band_pairs(sf_dir).select_columns(["a", "b"])
    )


CROSS_MOD = 3  # doc_id % 3 == 0 -> "new crawl increment", else base corpus
CROSS_TAU = 0.5  # verify threshold (same as the intra-corpus near-dup ops)


def q_dedup_cross_corpus(sf_dir: str):
    """INCREMENTAL near-dedup: check a new crawl increment against the
    accumulated base corpus without re-pairing the corpus against
    itself. Both sides minhash in one streaming pass; inside each LSH
    band bucket only new×base pairs are emitted (``cross_bucket_pairs``
    — O(new × base-in-bucket), never O(bucket²)); candidates verify
    with n-gram Jaccard >= CROSS_TAU via the distributed text joins;
    one groupby rolls up each flagged new doc to its earliest base
    match. The monthly-snapshot dedup loop of a Common-Crawl pipeline:
    at 100 TB the base side's band table is a static index you re-read
    per increment, and only increment-sized data moves."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = docs.map_batches(
        dd.MinHasher, batch_format="pyarrow", concurrency=_apool(),
    )
    bands = sigs.map_batches(dd.explode_bands, batch_format="pyarrow")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: dd.cross_bucket_pairs(g, split_mod=CROSS_MOD),
        batch_format="pyarrow",
    )
    distinct = _norm_int_blocks(_distinct_pairs(pairs), ["a", "b"])
    verified = dd.attach_pair_texts(distinct, docs).map_batches(
        dd.jaccard_pairs_batch, batch_format="pyarrow"
    ).filter(expr=f"jaccard >= {CROSS_TAU}").select_columns(["a", "b"])
    return verified.groupby("a").aggregate(
        ray.data.aggregate.Min("b", alias_name="match_doc_id"),
        ray.data.aggregate.Count(alias_name="n_matches"),
    ).rename_columns({"a": "new_doc_id"})


def q_readability(sf_dir: str):
    """Flesch reading-ease signals per doc (words / sentences /
    vowel-group syllables, score in integer milli-units) — a standard
    cheap quality-gate feature (C4/Gopher-era filters). Embarrassingly
    parallel single pass; integer-exact, so the oracle replicates the
    score bit-for-bit including DuckDB's truncate-toward-zero
    division."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.readability_batch, batch_format="pyarrow", zero_copy_batch=True,
    )


# deterministic multilingual page derivation for script_mix (the raw
# fixture text is ASCII-only; the injection gives every script class
# real mass, mirrored by the oracle's repeat())
SCRIPT_CYR = "Привет мир "
SCRIPT_CJK = "中文网页 "
SCRIPT_CLASSES = [
    ("latin", r"[A-Za-z]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("cjk", r"[\x{4E00}-\x{9FFF}]"),
    ("digit", r"[0-9]"),
]


def q_script_mix(sf_dir: str):
    """Unicode-script composition per page (the multilingual-curation
    triage CCNet does before language ID: a page that is 40% CJK chars
    with an 'en' label is a mislabel/mixed page). Counts per-script
    chars with RE2 kernels (pyarrow count_substring_regex — the same
    regex engine DuckDB uses, so the \\x{...} class patterns are shared
    verbatim), emits the dominant script (first-wins preference order)
    and the non-Latin share in integer parts-per-million via floor
    division — no float anywhere. Stateless single pass, no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        pages = pa.array(
            [
                (txt or "") + " " + SCRIPT_CYR * (i % 3)
                + SCRIPT_CJK * (i % 4) + "42 " * (i % 2)
                for i, txt in zip(ids, t["text"].to_pylist())
            ],
            pa.string(),
        )
        counts = {
            name: pc.cast(
                pc.count_substring_regex(pages, pattern=pat), pa.int64()
            ).to_numpy()
            for name, pat in SCRIPT_CLASSES
        }
        C = np.stack([counts[n] for n, _ in SCRIPT_CLASSES])  # (4, n)
        best = np.argmax(C, axis=0)  # first max wins = preference order
        names = np.array([n for n, _ in SCRIPT_CLASSES])
        dominant = np.where(C.sum(axis=0) > 0, names[best], "none")
        total = np.maximum(C.sum(axis=0), 1)
        nonlatin = counts["cyrillic"] + counts["cjk"]
        ppm = nonlatin * 1_000_000 // total
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_latin": pa.array(counts["latin"], pa.int64()),
                "n_cyrillic": pa.array(counts["cyrillic"], pa.int64()),
                "n_cjk": pa.array(counts["cjk"], pa.int64()),
                "n_digit": pa.array(counts["digit"], pa.int64()),
                "dominant_script": pa.array(dominant.tolist(), pa.string()),
                "nonlatin_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


DOM_TAG_RE = re.compile(r"<([a-z][a-z0-9]*)")


def q_dom_templates(sf_dir: str):
    """Structural template detection over raw HTML (the boilerplate
    discovery step of a main-content extractor: pages sharing one DOM
    skeleton come from one CMS template, and per-template extraction
    rules beat per-page heuristics). Tag-sequence md5 per page — a
    stateless map over the binary column — then ONE groupby on
    (host, structure) whose groups are template clusters: counters and
    a min-url exemplar move, never page bytes."""

    def _host(u: str) -> str:
        parts = u.split("://", 1)
        rest = parts[1] if len(parts) == 2 else ""
        return rest.split("/", 1)[0]

    def f(t: pa.Table) -> pa.Table:
        hosts, hashes = [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            tags = DOM_TAG_RE.findall(h.decode("utf-8"))
            hosts.append(_host(u))
            hashes.append(
                hashlib.md5(">".join(tags).encode("utf-8")).hexdigest()
            )
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "struct_md5": pa.array(hashes, pa.string()),
                "url": t["url"],
            }
        )

    return (
        rd.read_parquet(link_corpus(), columns=["url", "html"])
        .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["host", "struct_md5"])
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_pages"),
            ray.data.aggregate.Min("url", alias_name="sample_url"),
        )
    )


def q_ann_recall(sf_dir: str):
    """ANN quality evaluation IN-ENGINE: recall@K of the sign-LSH index
    (knn_lsh) against the brute-force ground truth (knn_brute), per
    query and in integer ppm. This is the measurement loop you run
    before re-tuning LSH tables/planes on a new corpus — both inputs
    are deterministic here, so even the evaluation is value-verified.
    Shape: tagged union of the two bounded result sets (K rows per
    query each) -> (query, neighbor) groupby marking hits -> per-query
    rollup. Groupbys only — no join, so the rare-row empty-partition
    join hazard can't arise; everything after the two ANN/brute passes
    moves O(queries x K) rows.

    Both branch results are materialized BEFORE the union: each is a
    bounded K x N_QUERIES table (50 rows), and running two autoscaling
    actor pools under ONE streaming executor has a scale-down race in
    ray 2.49 (a pool that "consumed all inputs" can be reaped while the
    sibling branch's task is in flight; the stream then stalls forever
    — observed as a 26-min hang in the 4-CPU test session). Sequential
    bounded materialization removes the trigger and costs two tiny
    blocks."""
    brute = q_knn_brute(sf_dir).materialize()
    ann = (
        q_knn_lsh(sf_dir)
        .select_columns(["query_id", "neighbor_id"])
        .materialize()
    )

    def tag(kind: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()),
                     "neighbor_id": pa.array([], pa.int64()),
                     "kind": pa.array([], pa.int64())}
                )
            return pa.table(
                {"query_id": t["query_id"],
                 "neighbor_id": t["neighbor_id"],
                 "kind": pa.array([kind] * t.num_rows, pa.int64())}
            )

        return f

    both = brute.map_batches(tag(0), batch_format="pyarrow").union(
        ann.map_batches(tag(1), batch_format="pyarrow")
    )

    def pair_flags(g: pa.Table) -> pa.Table:
        kinds = set(g["kind"].to_pylist())
        return pa.table(
            {
                "query_id": g["query_id"].slice(0, 1),
                "in_truth": pa.array([1 if 0 in kinds else 0], pa.int64()),
                "hit": pa.array(
                    [1 if kinds == {0, 1} else 0], pa.int64()
                ),
            }
        )

    per_pair = both.groupby(["query_id", "neighbor_id"]).map_groups(
        pair_flags, batch_format="pyarrow"
    )
    agg = per_pair.groupby("query_id").aggregate(
        ray.data.aggregate.Sum("in_truth", alias_name="k_truth"),
        ray.data.aggregate.Sum("hit", alias_name="n_hits"),
    )

    def finish(t: pa.Table) -> pa.Table:
        kt = pc.cast(t["k_truth"], pa.int64())
        nh = pc.cast(t["n_hits"], pa.int64())
        return pa.table(
            {
                "query_id": t["query_id"],
                "k_truth": kt,
                "n_hits": nh,
                # nonnegative ints: Arrow truncation == floor == SQL //
                "recall_ppm": pc.divide(
                    pc.multiply(nh, pa.scalar(1_000_000, pa.int64())), kt
                ),
            }
        )

    return agg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


PREFIX_K = 16  # tokens hashed for truncation-duplicate detection


def q_dedup_prefix(sf_dir: str):
    """Truncation-duplicate detection: documents sharing their first
    PREFIX_K tokens (the same article cut at different lengths — a
    near-dup class MinHash under-weights, because the shared prefix is
    a small fraction of the longer doc's shingles). One md5 per doc, ONE
    groupby on the 32-hex key moving counters only; groups with >= 2
    members surface with their keep representative (min doc_id)."""

    def f(t: pa.Table) -> pa.Table:
        hashes = []
        for txt in t["text"].to_pylist():
            toks = [w for w in (txt or "").split(" ") if w][:PREFIX_K]
            hashes.append(
                hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "prefix_md5": pa.array(hashes, pa.string()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("prefix_md5")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_docs"),
            ray.data.aggregate.Min("doc_id", alias_name="keep_doc_id"),
        )
        .filter(expr="n_docs >= 2")
    )





def q_event_transitions(sf_dir: str):
    """Per-user event-type Markov transition counts — the behavioral
    bigram table behind next-event prediction and bot/anomaly triage.
    Groupby user (bounded per-user history, same partitioning contract as
    sessionize), per-group (ts, event_id) sort → consecutive-pair Counter
    partials, then ONE global groupby sum over O(event_types²) keys: the
    corpus shuffles once by user; only O(users × distinct transitions)
    tiny partial rows reach the second groupby. Integer-exact."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        types = g["event_type"].take(idx).to_pylist()
        c = Counter(zip(types, types[1:]))
        prev = [k[0] for k in c]
        nxt = [k[1] for k in c]
        return pa.table(
            {
                "prev_type": pa.array(prev, pa.string()),
                "next_type": pa.array(nxt, pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )
