"""Global-statistics + broadcast-search operators (session 16).

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
    DAY_US, EDITDIST_CAP, _apool, _lev_bytes,
    _pq, _read,
)
from .qdedup import (  # noqa: F401
    EMBED_DIMS,
)
from .qsimilarity import (  # noqa: F401
    _ts_minmax_footer,
)
from .qrelational import (  # noqa: F401
    SESSION_GAP_S,
)
from .qquality import (  # noqa: F401
    LINK_N,
)
from .qgraph import (  # noqa: F401
    _und_edges_ds, crawl_diff_corpus, link_corpus, q_media_phash_pairs,
    recrawl_corpus,
)
from .qanalytics import (  # noqa: F401
    q_event_transitions,
)



EV_STAT_SCALE = 10 ** 12
EV_STAT_ITERS = 8


def q_event_stationary(sf_dir: str):
    """Stationary distribution of the event-type Markov chain (power
    iteration on the transition matrix, EV_STAT_ITERS synchronous
    rounds, integer fixed-point at 10^12 like PageRank so driver and
    SQL replay bit-identically): the behavioral steady-state — where a
    user's session settles regardless of entry point. The transition
    TABLE is built distributed (q_event_transitions: corpus shuffles
    once by user, O(types²) counter rows out); the iteration itself
    runs on the driver because the state space is SCHEMA-bounded
    (event-type cardinality), never corpus-sized — the justified
    small-side reduce, same argument as the PR_DRIVER_EDGE_LIMIT route.
    Mass at types with no outgoing transitions is dropped each round
    (dangling, PageRank-style); the oracle replays the identical
    floor-division recurrence."""
    tr = q_event_transitions(sf_dir).take_all()
    states = sorted(
        {r["prev_type"] for r in tr} | {r["next_type"] for r in tr}
    )
    tot: dict[str, int] = {}
    for r in tr:
        tot[r["prev_type"]] = tot.get(r["prev_type"], 0) + r["n"]
    p = {s: EV_STAT_SCALE // len(states) for s in states}
    for _ in range(EV_STAT_ITERS):
        nxt = {s: 0 for s in states}
        for r in tr:
            nxt[r["next_type"]] += (
                p[r["prev_type"]] * r["n"]
            ) // tot[r["prev_type"]]
        p = nxt
    return pa.table(
        {
            "event_type": pa.array(states, pa.string()),
            "stationary_micro": pa.array(
                [p[s] // 10 ** 6 for s in states], pa.int64()
            ),
        }
    )


def q_event_entropy(sf_dir: str):
    """Conditional entropy H(next | prev) of the event-type chain, per
    prev_type — how predictable a user's next action is given the
    current one (low entropy = funnel-like flows, high = browsing).
    Rides on the transition table (one user shuffle, O(types²) rows
    out); the per-prev reduce is a groupby over that tiny table. Uses
    the same ln(tot) - Σ n·ln(n) / tot algebraic form as
    ``domain_entropy`` so driver and DuckDB sum identical terms before
    the 6-dp round."""
    tr = q_event_transitions(sf_dir)

    def per_prev(g: pa.Table) -> pa.Table:
        n = np.asarray(g["n"].to_pylist(), dtype=np.float64)
        tot = n.sum()
        ent = float(np.log(tot) - float((n * np.log(n)).sum()) / tot)
        return pa.table(
            {
                "prev_type": pa.array([g["prev_type"][0].as_py()],
                                      pa.string()),
                "n_out": pa.array([int(tot)], pa.int64()),
                "entropy_nats": pa.array([round(ent, 6)], pa.float64()),
            }
        )

    return tr.groupby("prev_type").map_groups(
        per_prev, batch_format="pyarrow"
    )


SURV_MAX_D = 14


def q_user_survival(sf_dir: str):
    """Discrete user-lifetime survival curve S(d) = fraction of users
    whose observed activity span (last ts − first ts, floor-days)
    reaches at least d, for d = 0..SURV_MAX_D (capped) — the retention
    decay shape behind churn triage. One groupby(user) Min/Max shuffle
    → per-batch lifetime histogram partials → a ≤(cap+1)-row groupby;
    the cumulative tail runs on that bounded table (driver reduce over
    ≤16 rows, never corpus-sized)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
            }
        )

    spans = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            ray.data.aggregate.Min("us", alias_name="min_us"),
            ray.data.aggregate.Max("us", alias_name="max_us"),
        )
    )

    def hist(t: pa.Table) -> pa.Table:
        lo = np.asarray(t["min_us"].to_pylist(), dtype=np.int64)
        hi = np.asarray(t["max_us"].to_pylist(), dtype=np.int64)
        d = np.minimum((hi - lo) // DAY_US, SURV_MAX_D)
        c = Counter(d.tolist())
        return pa.table(
            {
                "d": pa.array([int(k) for k in c], pa.int64()),
                "n": pa.array([int(v) for v in c.values()], pa.int64()),
            }
        )

    rows = (
        spans.map_batches(hist, batch_format="pyarrow")
        .groupby("d")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()  # bounded: <= SURV_MAX_D + 1 rows by construction
    )
    by_d = {r["d"]: r["n"] for r in rows}
    total = sum(by_d.values())
    days = list(range(SURV_MAX_D + 1))
    surv = [sum(n for d, n in by_d.items() if d >= day) for day in days]
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "n_surviving": pa.array(surv, pa.int64()),
            "frac_surviving": pa.array(
                [round(s / total, 6) if total else 0.0 for s in surv],
                pa.float64(),
            ),
        }
    )


USER_SURVIVAL_SQL = f"""
with u as (select user_id,
             (epoch_us(max(ts)) - epoch_us(min(ts))) // {DAY_US} as d
           from events group by user_id),
uc as (select least(d, {SURV_MAX_D})::bigint as d, count(*)::bigint as n
       from u group by 1),
t as (select sum(n)::bigint as nn from uc),
days as (select unnest(range(0, {SURV_MAX_D + 1})) as day)
select day::bigint as day,
       coalesce((select sum(n) from uc where uc.d >= day), 0)::bigint
         as n_surviving,
       case when coalesce(t.nn, 0) > 0
            then round(
              coalesce((select sum(n) from uc where uc.d >= day),
                       0)::double / t.nn, 6)
            else 0.0 end as frac_surviving
from days, t
"""


def q_event_cusum(sf_dir: str):
    """Integer-exact CUSUM changepoint scan over each event type's
    daily volume: with observed-day counts n_i and per-type totals
    (nd days, tot events), the residual walk S_k = Σ_{i≤k}
    (n_i·nd − tot) removes the mean without division; the day of
    max |S_k| (tie → earliest) is the level-shift candidate — the
    crawl/traffic regime-change detector. Day grid = days with ≥1
    event (sparse-day semantics, documented). Partial (type, day)
    counts per batch → one groupby sum → per-type scan over a
    calendar-bounded group."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["ts"], pa.int64()), pa.scalar(DAY_US, pa.int64())
        )
        c = Counter(zip(t["event_type"].to_pylist(), day.to_pylist()))
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in c], pa.string()),
                "day": pa.array([k[1] for k in c], pa.int64()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    daily = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def scan(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("day", "ascending")])
        day = np.asarray(g["day"].take(idx).to_pylist(), dtype=np.int64)
        n = np.asarray(g["n"].take(idx).to_pylist(), dtype=np.int64)
        nd, tot = len(n), int(n.sum())
        s = np.cumsum(n * nd - tot)
        a = np.abs(s)
        j = int(np.lexsort((day, -a))[0])  # max |S|, then earliest day
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()],
                                       pa.string()),
                "n_days": pa.array([nd], pa.int64()),
                "total": pa.array([tot], pa.int64()),
                "cusum_max": pa.array([int(a[j])], pa.int64()),
                "cp_day": pa.array([int(day[j])], pa.int64()),
            }
        )

    return daily.groupby("event_type").map_groups(
        scan, batch_format="pyarrow"
    )


EVENT_CUSUM_SQL = f"""
with d as (select event_type, epoch_us(ts) // {DAY_US} as day,
                  count(*)::bigint as n
           from events group by 1, 2),
m as (select event_type, count(*)::bigint as nd, sum(n)::bigint as tot
      from d group by 1),
c as (select d.event_type, d.day,
             sum(d.n * m.nd - m.tot) over
               (partition by d.event_type order by d.day
                rows unbounded preceding) as s
      from d join m using (event_type)),
r as (select event_type, day, abs(s) as a,
             row_number() over (partition by event_type
                                order by abs(s) desc, day asc) as rn
      from c)
select r.event_type, m.nd as n_days, m.tot as total,
       r.a::bigint as cusum_max, r.day::bigint as cp_day
from r join m using (event_type) where rn = 1
"""


CHURN_CUT_RATIO = 70  # cutoff at 70% of the corpus time span


def q_user_features(sf_dir: str):
    """Churn-model training-set builder: one row per user active
    before the cutoff (cutoff = corpus min_ts + 70% of the span —
    derived from data so the operator is corpus-agnostic), with
    integer features computed ONLY from pre-cutoff events (no label
    leakage) and the label = had any event after the cutoff. The
    feature-assembly shape every behavioral model pipeline needs: one
    user shuffle, per-group O(history) integer rollups; the global
    cutoff is a 2-value broadcast from a metadata-cheap min/max pass."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    lo, hi = _ts_minmax_footer(_pq(sf_dir, "events"), "ts")
    if lo is None:  # footer stats absent → distributed Min/Max pass
        agg = (
            _read(sf_dir, "events", ["ts"])
            .map_batches(
                lambda b: pa.table(
                    {"us": pc.cast(b["ts"], pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .aggregate(
                ray.data.aggregate.Min("us", alias_name="lo"),
                ray.data.aggregate.Max("us", alias_name="hi"),
            )
        )
        lo, hi = int(agg["lo"]), int(agg["hi"])
    cut = lo + (hi - lo) * CHURN_CUT_RATIO // 100

    def per_user(g: pa.Table) -> pa.Table:
        us = np.asarray(
            pc.cast(g["ts"], pa.int64()).to_pylist(), dtype=np.int64
        )
        types = np.asarray(g["event_type"].to_pylist(), dtype=object)
        pre = us <= cut
        if not pre.any():
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "n_types": pa.array([], pa.int64()),
                 "n_purchases": pa.array([], pa.int64()),
                 "active_days": pa.array([], pa.int64()),
                 "recency_s": pa.array([], pa.int64()),
                 "label_retained": pa.array([], pa.int64())}
            )
        pu = us[pre]
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1),
                "n_events": pa.array([int(pre.sum())], pa.int64()),
                "n_types": pa.array(
                    [len(set(types[pre].tolist()))], pa.int64()
                ),
                "n_purchases": pa.array(
                    [int((types[pre] == "purchase").sum())], pa.int64()
                ),
                "active_days": pa.array(
                    [len(set((pu // DAY_US).tolist()))], pa.int64()
                ),
                "recency_s": pa.array(
                    [int((cut - pu.max()) // 1_000_000)], pa.int64()
                ),
                "label_retained": pa.array(
                    [int((~pre).any())], pa.int64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )


USER_FEATURES_SQL = f"""
with b as (select min(epoch_us(ts))::bigint as lo,
                  max(epoch_us(ts))::bigint as hi from events),
c as (select lo + (hi - lo) * {CHURN_CUT_RATIO} // 100 as cut from b),
pre as (select e.user_id, epoch_us(e.ts) as us, e.event_type
        from events e, c where epoch_us(e.ts) <= c.cut),
post as (select distinct user_id from events, c
         where epoch_us(ts) > c.cut)
select p.user_id,
       count(*)::bigint as n_events,
       count(distinct p.event_type)::bigint as n_types,
       sum(case when p.event_type = 'purchase' then 1 else 0 end)
         ::bigint as n_purchases,
       count(distinct p.us // {DAY_US})::bigint as active_days,
       ((select cut from c) - max(p.us)) // 1000000 as recency_s,
       (p.user_id in (select user_id from post))::bigint
         as label_retained
from pre p
group by p.user_id
"""


def q_event_burstiness(sf_dir: str):
    """Fano factor (index of dispersion) of each event type's daily
    volume, in ppm: F = sample-variance / mean over observed days —
    F ≈ 1e6 is Poisson-like organic traffic, F >> 1e6 is bursty
    (campaigns, incidents, bots). Same (type, day) partial-counter
    plan as event_cusum; the finish is the integer closed form
    (nd·Σn² − (Σn)²)·10⁶ // ((nd−1)·Σn), floor-exact on both sides —
    no float variance ever computed."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        us = np.asarray(
            pc.cast(t["ts"], pa.int64()).to_pylist(), dtype=np.int64
        )
        c = Counter(zip(t["event_type"].to_pylist(),
                        (us // DAY_US).tolist()))
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in c], pa.string()),
                "day": pa.array([k[1] for k in c], pa.int64()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    daily = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def finish(g: pa.Table) -> pa.Table:
        n = [int(v) for v in g["n"].to_pylist()]
        nd, s1 = len(n), sum(n)
        s2 = sum(v * v for v in n)
        fano = (
            (nd * s2 - s1 * s1) * 10 ** 6 // ((nd - 1) * s1)
            if nd > 1 and s1 else 0
        )
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "n_days": pa.array([nd], pa.int64()),
                "total": pa.array([s1], pa.int64()),
                "fano_ppm": pa.array([fano], pa.int64()),
            }
        )

    return daily.groupby("event_type").map_groups(
        finish, batch_format="pyarrow"
    )


EVENT_BURSTINESS_SQL = f"""
with d as (select event_type, epoch_us(ts) // {DAY_US} as day,
                  count(*)::bigint as n
           from events group by 1, 2),
m as (select event_type, count(*)::hugeint as nd,
             sum(n)::hugeint as s1, sum(n * n)::hugeint as s2
      from d group by 1)
select event_type, nd::bigint as n_days, s1::bigint as total,
       (case when nd > 1 and s1 > 0
             then (nd * s2 - s1 * s1) * 1000000 // ((nd - 1) * s1)
             else 0 end)::bigint as fano_ppm
from m
"""


CRAWL_BUDGET_TOTAL = 1_000_000  # fetches to allocate per cycle


def q_crawl_budget(sf_dir: str):
    """Proportional-fair crawl-budget allocation: each source gets
    budget ∝ isqrt(doc count) — the sublinear politeness curve (a
    10000-page site gets 100× the budget of a 1-page site, not
    10000×). Exact integer arithmetic end to end: isqrt on the engine
    side, floor(sqrt) on the IEEE-exact SQL side (exact for counts
    < 2^52); one counter-sized groupby then the allocation on the
    bounded source table."""
    rows = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .count()
        .take_all()  # bounded: one row per source
    )
    counts = sorted((r["source"], int(r["count()"])) for r in rows)
    w = {s: math.isqrt(n) for s, n in counts}
    tw = sum(w.values())
    return pa.table(
        {
            "source": pa.array([s for s, _ in counts], pa.string()),
            "n_docs": pa.array([n for _, n in counts], pa.int64()),
            "weight": pa.array([w[s] for s, _ in counts], pa.int64()),
            "budget": pa.array(
                [CRAWL_BUDGET_TOTAL * w[s] // tw for s, _ in counts],
                pa.int64(),
            ),
        }
    )


CRAWL_BUDGET_SQL = f"""
with c as (select source, count(*)::bigint as n from documents
           group by source),
w as (select source, n, floor(sqrt(n))::bigint as weight from c),
t as (select sum(weight)::bigint as tw from w)
select source, n as n_docs, weight,
       ({CRAWL_BUDGET_TOTAL} * weight // t.tw)::bigint as budget
from w, t
"""


def q_length_lognormal(sf_dir: str):
    """Method-of-moments log-normal fit of the document length
    distribution per source: μ = mean(ln n_chars), σ² from the same
    one-pass partials — the parametric summary behind length-outlier
    thresholds and synthetic-corpus generators (web doc lengths are
    canonically log-normal, Mitzenmacher'04). Per-element ln is
    quantized to integer NANO units before any summation (float sums
    across blocks are order-dependent; integer sums are exact in any
    order — the corpus_kl discipline), so partials combine
    deterministically at every scale. One pass of (Σln, Σln², n)
    integer partials per batch, one groupby over the bounded source
    key space; the two finished floats divide exact integers."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partials(t: pa.Table) -> pa.Table:
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        ln = np.log(
            np.maximum(
                np.asarray(t["n_chars"].to_pylist(), dtype=np.float64),
                1.0,
            )
        )
        # micro-ln: li ~ 6e6, li² ~ 4e13 — exact int64 sums through
        # ~10^5-row blocks and a 10^5-source reduce; at larger scales
        # widen to a two-column (hi, lo) split, same plan
        li = np.round(ln * 1e6).astype(np.int64)
        out_s, out_n, out_l, out_ll = [], [], [], []
        for s in np.unique(src):
            m = src == s
            out_s.append(str(s))
            out_n.append(int(m.sum()))
            out_l.append(int(li[m].sum()))
            out_ll.append(int((li[m] * li[m]).sum()))
        return pa.table(
            {
                "source": pa.array(out_s, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "sl": pa.array(out_l, pa.int64()),
                "sll": pa.array(out_ll, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("sl", alias_name="sl"),
            ray.data.aggregate.Sum("sll", alias_name="sll"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        mus, sigmas = [], []
        for n, sl, sll in zip(t["n"].to_pylist(), t["sl"].to_pylist(),
                              t["sll"].to_pylist()):
            mu = sl / (n * 1_000_000)
            ex2 = sll / (n * 1_000_000_000_000)
            var = max(ex2 - mu * mu, 0.0)
            mus.append(round(mu, 6))
            sigmas.append(round(math.sqrt(var), 6))
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pc.cast(t["n"], pa.int64()),
                "mu": pa.array(mus, pa.float64()),
                "sigma": pa.array(sigmas, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


LENGTH_LOGNORMAL_SQL = """
with p as (select source,
                  round(ln(greatest(n_chars, 1)::double) * 1000000)
                    ::bigint as li
           from documents),
m as (select source, count(*)::bigint as n,
             sum(li)::bigint as sl, sum(li * li)::bigint as sll
      from p group by source),
f as (select source, n, sl::double / (n * 1000000) as mu,
             sll::double / (n * 1000000000000) as ex2
      from m)
select source, n as n_docs, round(mu, 6) as mu,
       round(sqrt(greatest(ex2 - mu * mu, 0)), 6) as sigma
from f
"""


def q_weekday_seasonality(sf_dir: str):
    """Day-of-week seasonality per event type: volume, traffic share
    and the ×7-scaled seasonality index in ppm (10^6 = flat; the
    crawl-scheduler/capacity signal — a Sunday-quiet event stream gets
    its batch windows there). dow derives from the integer epoch day
    ((d+4) mod 7, 0 = Sunday — 1970-01-01 was a Thursday), so both
    sides bucket identically with no calendar library. Batch partial
    counters → one groupby over ≤ types×7 keys → per-type finish on
    the bounded counter table."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        us = np.asarray(
            pc.cast(t["ts"], pa.int64()).to_pylist(), dtype=np.int64
        )
        dow = (us // DAY_US + 4) % 7
        c = Counter(zip(t["event_type"].to_pylist(), dow.tolist()))
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in c], pa.string()),
                "dow": pa.array([k[1] for k in c], pa.int64()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counters = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "dow"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def finish(g: pa.Table) -> pa.Table:
        n = np.asarray(g["n"].to_pylist(), dtype=np.int64)
        tot = int(n.sum())
        return pa.table(
            {
                "event_type": pc.cast(g["event_type"], pa.string()),
                "dow": pc.cast(g["dow"], pa.int64()),
                "n": pa.array(n, pa.int64()),
                "share_ppm": pa.array(n * 10 ** 6 // tot, pa.int64()),
                "index_ppm": pa.array(n * 7 * 10 ** 6 // tot, pa.int64()),
            }
        )

    return counters.groupby("event_type").map_groups(
        finish, batch_format="pyarrow"
    )


WEEKDAY_SEASONALITY_SQL = f"""
with d as (select event_type,
                  (epoch_us(ts) // {DAY_US} + 4) % 7 as dow,
                  count(*)::bigint as n
           from events group by 1, 2),
t as (select event_type, sum(n)::bigint as tot from d group by 1)
select d.event_type, d.dow::bigint as dow, d.n,
       (d.n * 1000000 // t.tot)::bigint as share_ppm,
       (d.n * 7 * 1000000 // t.tot)::bigint as index_ppm
from d join t using (event_type)
"""


def q_graph_assortativity(sf_dir: str):
    """Degree assortativity (Newman, PRL'02) of the undirected simple
    link graph: the Pearson correlation of endpoint degrees over all
    edges — hub-to-hub wiring (r > 0, syndication rings) vs
    hub-to-leaf (r < 0, the organic web's signature). Undirected
    distinct edges (the triangles idiom) → degree table via one
    endpoint groupby → two hash joins attach (deg_a, deg_b) → integer
    partial sums per batch (symmetrized, so ΣX = ΣY and one pass
    suffices) → ONE float division of exact ints at the finish,
    replayed verbatim in hugeint SQL."""
    und = _und_edges_ds(link_corpus()).materialize()
    nparts = dd.adaptive_partitions(LINK_N)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t["a"].combine_chunks(), t["b"].combine_chunks()]
            )}
        )

    deg = (
        und.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(ray.data.aggregate.Count(alias_name="deg"))
    )
    ja = sj.safe_join(und, deg, join_type="inner",
                      num_partitions=nparts,
                      on=("a",), right_on=("node",),
                      left_schema=pa.schema([("a", pa.string()), ("b", pa.string())]))
    jb = sj.safe_join(ja, deg, join_type="inner",
                      num_partitions=nparts,
                      on=("b",), right_on=("node",), right_suffix="_b")

    def sums(t: pa.Table) -> pa.Table:
        da = np.asarray(pc.cast(t["deg"], pa.int64()).to_pylist(),
                        dtype=object)
        db = np.asarray(pc.cast(t["deg_b"], pa.int64()).to_pylist(),
                        dtype=object)
        # python ints: the sums are exact at any scale
        sx = int(sum(da) + sum(db))
        sxx = int(sum(x * x for x in da) + sum(x * x for x in db))
        sxy = int(2 * sum(x * y for x, y in zip(da, db)))
        return pa.table(
            {
                "m": pa.array([2 * len(t)], pa.int64()),
                "sx": pa.array([sx], pa.int64()),
                "sxx": pa.array([sxx], pa.int64()),
                "sxy": pa.array([sxy], pa.int64()),
            }
        )

    rows = jb.map_batches(sums, batch_format="pyarrow").take_all()
    m = sum(r["m"] for r in rows)
    sx = sum(r["sx"] for r in rows)
    sxx = sum(r["sxx"] for r in rows)
    sxy = sum(r["sxy"] for r in rows)
    den = m * sxx - sx * sx
    r_ = round((m * sxy - sx * sx) / den, 6) if den else 0.0
    return pa.table(
        {
            "n_edges": pa.array([m // 2], pa.int64()),
            "assortativity": pa.array([r_], pa.float64()),
        }
    )


AB_CONV_WINDOW_US = 3_600_000_000  # click->purchase attribution window


def q_attribution_delay(sf_dir: str):
    """Exact percentiles (type-1/lower quantile: smallest value whose
    cumulative count reaches ceil(q·N)) of the click→purchase
    attribution delay, in whole seconds — the latency distribution
    that sets the attribution window itself (ab_lift's 1 h is exactly
    a p~99 choice). Every purchase with a prior click contributes its
    delay to the LATEST click (same searchsorted probe as ab_lift,
    uncapped); whole-second delays land in a bounded counter keyspace,
    so the quantile runs on a tiny table after one user shuffle +
    one counter groupby — the value-histogram plan, no global sort."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        us = np.asarray(
            pc.cast(g["ts"], pa.int64()).to_pylist(), dtype=np.int64
        )
        types = np.asarray(g["event_type"].to_pylist(), dtype=object)
        clicks = np.sort(us[types == "click"])
        purch = np.sort(us[types == "purchase"])
        if not (len(clicks) and len(purch)):
            return pa.table({"delay_s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        j = np.searchsorted(clicks, purch, side="right") - 1
        ok = j >= 0
        d = (purch[ok] - clicks[j[ok]]) // 1_000_000
        c = Counter(d.tolist())
        return pa.table(
            {
                "delay_s": pa.array(list(c.keys()), pa.int64()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    rows = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("delay_s")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()  # bounded: one row per distinct whole-second delay
    )
    hist = sorted((r["delay_s"], r["n"]) for r in rows)
    total = sum(n for _, n in hist)

    def pct(q100: int) -> int:
        need = -(-q100 * total // 100)  # ceil(q*N) in integers
        cum = 0
        for v, n in hist:
            cum += n
            if cum >= need:
                return int(v)
        return int(hist[-1][0]) if hist else 0

    return pa.table(
        {
            "n_delays": pa.array([total], pa.int64()),
            "p50_s": pa.array([pct(50)], pa.int64()),
            "p90_s": pa.array([pct(90)], pa.int64()),
            "p99_s": pa.array([pct(99)], pa.int64()),
        }
    )


ATTRIBUTION_DELAY_SQL = """
with c as (select user_id, epoch_us(ts) as cus from events
           where event_type = 'click'),
p as (select user_id, event_id, epoch_us(ts) as pus from events
      where event_type = 'purchase'),
lastc as (select p.event_id, p.pus, max(c.cus) as cus
          from p join c on c.user_id = p.user_id and c.cus <= p.pus
          group by p.event_id, p.pus),
d as (select (pus - cus) // 1000000 as delay_s from lastc),
h as (select delay_s, count(*)::bigint as n from d group by delay_s),
t as (select sum(n)::bigint as total from h),
cum as (select delay_s, sum(n) over (order by delay_s
                                     rows unbounded preceding) as c
        from h)
select coalesce(t.total, 0)::bigint as n_delays,
       coalesce((select min(delay_s) from cum
                 where c >= (50 * t.total + 99) // 100), 0)::bigint
         as p50_s,
       coalesce((select min(delay_s) from cum
                 where c >= (90 * t.total + 99) // 100), 0)::bigint
         as p90_s,
       coalesce((select min(delay_s) from cum
                 where c >= (99 * t.total + 99) // 100), 0)::bigint
         as p99_s
from t
"""


def q_ab_lift(sf_dir: str):
    """Two-sample conversion lift with the pooled z-statistic: users
    are deterministically split into arms by md5(user_id) parity (the
    split_assign discipline — reproducible across reruns and engines,
    no RNG state); conversion = a 'purchase' within AB_CONV_WINDOW_US
    after a 'click' by the same user (the attribution-window funnel —
    plain "ever purchased" saturates on any engaged population). One
    groupby(user) shuffle (the sessionize partitioning contract) scores
    each bounded history with a sorted-array window probe; arm counts
    reduce via batch partials to a 2-row table and the z-score is a
    driver finish on four exact integers (one float expression total,
    replayed verbatim in SQL)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        us = np.asarray(
            pc.cast(g["ts"], pa.int64()).to_pylist(), dtype=np.int64
        )
        types = np.asarray(g["event_type"].to_pylist(), dtype=object)
        clicks = np.sort(us[types == "click"])
        purch = np.sort(us[types == "purchase"])
        conv = 0
        if len(clicks) and len(purch):
            # latest click at-or-before each purchase must fall inside
            # the attribution window
            j = np.searchsorted(clicks, purch, side="right") - 1
            ok = j >= 0
            conv = int(
                (purch[ok] - clicks[j[ok]] <= AB_CONV_WINDOW_US).any()
            )
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1),
                "conv": pa.array([conv], pa.int64()),
            }
        )

    users = ds.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )

    def partials(t: pa.Table) -> pa.Table:
        uids = t["user_id"].to_pylist()
        conv = np.asarray(t["conv"].to_pylist(), dtype=np.int64)
        arm = np.asarray(
            [dd._hash64(str(u)) % 2 for u in uids], dtype=np.int64
        )
        out_arm, out_n, out_c = [], [], []
        for a in (0, 1):
            m = arm == a
            if m.any():
                out_arm.append("A" if a == 0 else "B")
                out_n.append(int(m.sum()))
                out_c.append(int(conv[m].sum()))
        return pa.table(
            {
                "arm": pa.array(out_arm, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "conv": pa.array(out_c, pa.int64()),
            }
        )

    rows = (
        users.map_batches(partials, batch_format="pyarrow")
        .groupby("arm")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("conv", alias_name="conv"),
        )
        .take_all()  # exactly two rows
    )
    by = {r["arm"]: (int(r["n"]), int(r["conv"])) for r in rows}
    na, ca = by.get("A", (0, 0))
    nb, cb = by.get("B", (0, 0))
    if na and nb and (ca + cb) and (ca + cb) < (na + nb):
        pa_, pb_ = ca / na, cb / nb
        pp = (ca + cb) / (na + nb)
        z = round(
            (pa_ - pb_) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb)), 6
        )
    else:
        z = 0.0
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "conv_a": pa.array([ca], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "conv_b": pa.array([cb], pa.int64()),
            "lift_ppm": pa.array(
                [
                    int(ca * 10 ** 6 // na - cb * 10 ** 6 // nb)
                    if na and nb else 0
                ],
                pa.int64(),
            ),
            "z_score": pa.array([z], pa.float64()),
        }
    )


AB_LIFT_SQL = f"""
with c as (select user_id, epoch_us(ts) as cus from events
           where event_type = 'click'),
p as (select user_id, epoch_us(ts) as pus from events
      where event_type = 'purchase'),
cu as (select distinct c.user_id from c join p using (user_id)
       where p.pus - c.cus between 0 and {AB_CONV_WINDOW_US}),
u as (select user_id,
             (user_id in (select user_id from cu))::int as conv
      from (select distinct user_id from events)),
a as (select case when ('0x' || substr(md5(user_id::varchar), 1, 16))
                      ::ubigint % 2 = 0
             then 'A' else 'B' end as arm, conv
      from u),
m as (select
        sum(case when arm = 'A' then 1 else 0 end)::bigint as na,
        sum(case when arm = 'A' then conv else 0 end)::bigint as ca,
        sum(case when arm = 'B' then 1 else 0 end)::bigint as nb,
        sum(case when arm = 'B' then conv else 0 end)::bigint as cb
      from a)
select na as n_a, ca as conv_a, nb as n_b, cb as conv_b,
       case when na > 0 and nb > 0
            then (ca * 1000000 // na - cb * 1000000 // nb)::bigint
            else 0 end as lift_ppm,
       case when na > 0 and nb > 0 and (ca + cb) > 0
                 and (ca + cb) < (na + nb)
            then round((ca::double / na - cb::double / nb)
                       / sqrt(((ca + cb)::double / (na + nb))
                              * (1 - (ca + cb)::double / (na + nb))
                              * (1.0 / na + 1.0 / nb)), 6)
            else 0.0 end as z_score
from m
"""


def q_event_gaps_hist(sf_dir: str):
    """Log2 histogram of per-user inter-event gaps (whole seconds;
    bucket k covers [2^(k-1), 2^k) s, bucket 0 = sub-second) — the
    arrival-process shape that picks the sessionize gap threshold and
    exposes bot cadences (a spike in one narrow bucket). Same
    partitioning contract as sessionize: one user shuffle, per-group
    integer bucket Counter partials, then a groupby over ≤64 bucket
    keys. bit_length == the SQL length(format('{:b}', g)) idiom, so
    both sides bucket identically with no float log."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def per_user(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        us = np.asarray(
            pc.cast(g["ts"].take(idx), pa.int64()).to_pylist(),
            dtype=np.int64,
        )
        gs = np.diff(us) // 1_000_000
        c = Counter(int(v).bit_length() for v in gs)
        return pa.table(
            {
                "bucket": pa.array(list(c.keys()), pa.int64()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )


EVENT_GAPS_HIST_SQL = """
with w as (select user_id, epoch_us(ts) as us, ts, event_id from events),
g as (select user_id,
             (us - lag(us) over (partition by user_id
                                 order by ts, event_id)) // 1000000 as gs
      from w),
b as (select case when gs = 0 then 0
             else length(format('{:b}', gs)) end as bucket
      from g where gs is not null)
select bucket::bigint as bucket, count(*)::bigint as n
from b group by bucket
"""


def q_domain_gini(sf_dir: str):
    """Gini coefficient of the per-source document concentration — the
    single-number mixture-skew audit next to domain_entropy (a corpus
    where one crawl host contributes half the docs trains a lopsided
    model even if entropy looks tolerable). One counter-sized groupby;
    the closed-form Gini (2·Σ i·nᵢ − (K+1)·T) / (K·T) over the
    (n asc, source asc)-ranked counts is a driver finish on the
    bounded source table with an exact integer numerator — one float
    division total, identical in SQL."""
    rows = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .count()
        .take_all()  # bounded: one row per source
    )
    counts = sorted((int(r["count()"]), r["source"]) for r in rows)
    k = len(counts)
    t = sum(n for n, _ in counts)
    s = sum(i * n for i, (n, _) in enumerate(counts, start=1))
    gini = round((2 * s - (k + 1) * t) / (k * t), 6) if k and t else 0.0
    return pa.table(
        {
            "n_sources": pa.array([k], pa.int64()),
            "n_docs": pa.array([t], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


DOMAIN_GINI_SQL = """
with c as (select source, count(*)::bigint as n from documents
           group by source),
r as (select n, row_number() over (order by n asc, source asc) as i
      from c),
m as (select count(*)::bigint as k, sum(n)::bigint as t,
             sum(i * n)::bigint as s from r)
select k as n_sources, t as n_docs,
       round((2 * s - (k + 1) * t)::double / (k * t)::double, 6) as gini
from m
"""


def q_embed_standardize(sf_dir: str):
    """Global per-dimension z-score standardization of the embedding
    column (the whitening step before k-means / outlier scoring / linear
    probes). Pass 1 reduces the corpus to 64 (sum, sumsq, n) rows via
    per-batch numpy partials + groupby(d) sums — O(dims × blocks) rows
    ever move; pass 2 is a stateless vectorized map with the 64-value
    mean/std captured in the closure (plain values, restart-safe). Both
    sides compute sd = sqrt(max(avg(v²) − avg(v)², 0)) in float64 and
    round the final z to 6 dp; zero-variance dims emit z = 0. Output is
    long-form (vec_id, pos, z), pos 1-based to match SQL
    ``generate_subscripts``."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def partials(t: pa.Table) -> pa.Table:
        x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        if x.size == 0:
            x = np.zeros((0, EMBED_DIMS), dtype=np.float64)
        return pa.table(
            {
                "d": pa.array(range(EMBED_DIMS), pa.int64()),
                "s1": pa.array(x.sum(axis=0), pa.float64()),
                "s2": pa.array((x * x).sum(axis=0), pa.float64()),
                "n": pa.array([len(x)] * EMBED_DIMS, pa.int64()),
            }
        )

    rows = (
        emb.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("d")
        .aggregate(
            ray.data.aggregate.Sum("s1", alias_name="s1"),
            ray.data.aggregate.Sum("s2", alias_name="s2"),
            ray.data.aggregate.Sum("n", alias_name="n"),
        )
        .take_all()  # bounded: exactly EMBED_DIMS rows
    )
    m = np.zeros(EMBED_DIMS, dtype=np.float64)
    sd = np.zeros(EMBED_DIMS, dtype=np.float64)
    for r in rows:
        d = int(r["d"])
        n = float(r["n"])
        mu = float(r["s1"]) / n
        m[d] = mu
        sd[d] = math.sqrt(max(float(r["s2"]) / n - mu * mu, 0.0))

    def zscore(t: pa.Table) -> pa.Table:
        x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        if x.size == 0:
            x = np.zeros((0, EMBED_DIMS), dtype=np.float64)
        safe = np.where(sd == 0.0, 1.0, sd)
        z = np.round((x - m[None, :]) / safe[None, :], 6)
        z = np.where(sd[None, :] == 0.0, 0.0, z)
        ids = np.repeat(
            np.asarray(t["vec_id"].to_pylist(), dtype=np.int64), EMBED_DIMS
        )
        pos = np.tile(np.arange(1, EMBED_DIMS + 1, dtype=np.int64), len(x))
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "z": pa.array(z.ravel(), pa.float64()),
            }
        )

    return emb.map_batches(zscore, batch_format="pyarrow", zero_copy_batch=True)


def _embed_moment_sums(sf_dir: str):
    """Distributed (XᵀX, Σx, n) reduction of the embedding table — the
    bounded O(d²) statistic distributed PCA / covariance needs. Each
    block contributes one d×d numpy-matmul partial as long rows; a
    groupby sums O(d²) keys; d(d+1)/2 + d rows reach the driver —
    bounded by the DIMENSION, independent of data size. Returns
    (gram_sums (d,d) symmetric, col_sums (d,), n_rows)."""
    emb = _read(sf_dir, "embeddings", ["embedding"])
    iu, ju = np.triu_indices(EMBED_DIMS)

    def partials(t: pa.Table) -> pa.Table:
        x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        if x.size == 0:
            x = np.zeros((0, EMBED_DIMS), dtype=np.float64)
        g = x.T @ x
        i = np.concatenate([iu, np.arange(EMBED_DIMS)])
        j = np.concatenate([ju, np.full(EMBED_DIMS, -1)])
        v = np.concatenate([g[iu, ju], x.sum(axis=0)])
        return pa.table(
            {
                "i": pa.array(i, pa.int64()),
                "j": pa.array(j, pa.int64()),
                "v": pa.array(v, pa.float64()),
                "n": pa.array(np.full(len(i), len(x)), pa.int64()),
            }
        )

    rows = (
        emb.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .aggregate(
            ray.data.aggregate.Sum("v", alias_name="v"),
            ray.data.aggregate.Sum("n", alias_name="n"),
        )
        .take_all()  # bounded: d(d+1)/2 + d rows, data-size-independent
    )
    G = np.zeros((EMBED_DIMS, EMBED_DIMS), dtype=np.float64)
    S = np.zeros(EMBED_DIMS, dtype=np.float64)
    n_total = 0
    for r in rows:
        i, j = int(r["i"]), int(r["j"])
        if j == -1:
            S[i] = float(r["v"])
            n_total = int(r["n"])
        else:
            G[i, j] = float(r["v"])
            G[j, i] = float(r["v"])
    return G, S, n_total


def q_embed_covariance(sf_dir: str):
    """Exact covariance matrix of the embedding dimensions — the input
    to distributed PCA (reduction in ``_embed_moment_sums``; the eigen
    step of PCA runs on this 64×64 result, see q_embed_pca). Emits the
    1-based upper triangle with cov = Σxy/n − mean_i·mean_j in float64,
    rounded to 6, exactly the formula the oracle replays."""
    G, S, n_total = _embed_moment_sums(sf_dir)
    means = S / n_total
    iu, ju = np.triu_indices(EMBED_DIMS)
    cov = np.round(G[iu, ju] / n_total - means[iu] * means[ju], 6)
    return pa.table(
        {
            "i": pa.array(iu + 1, pa.int64()),
            "j": pa.array(ju + 1, pa.int64()),
            "cov": pa.array(cov, pa.float64()),
        }
    )


def _pca_top_component(C: np.ndarray) -> np.ndarray:
    """Dominant eigenvector of a symmetric matrix via np.linalg.eigh
    (deterministic), sign-fixed so the largest-|coordinate| entry is
    positive."""
    w, V = np.linalg.eigh((C + C.T) / 2.0)
    v = V[:, -1]
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return v


def q_embed_pca(sf_dir: str):
    """Distributed PCA with the loop closed: the corpus reduces to the
    d×d moment matrix (one numpy XᵀX partial per block — see
    ``_embed_moment_sums``), the eigen step runs driver-side on the
    64×64 covariance (data-size-independent), and the projection onto
    the top principal component is a stateless vectorized second pass
    over the corpus. Output: (vec_id, pc1 = v·(x − mean), rounded 6).
    The oracle replays the PROJECTION with the eigenvector/mean embedded
    as literals (the same data-dependent-literal composition knn_ivf's
    centroids use); the eigen step itself is pytest-verified against
    numpy on the raw table (tests/test_webtext_session16.py)."""
    G, S, n_total = _embed_moment_sums(sf_dir)
    m = S / n_total
    C = G / n_total - np.outer(m, m)
    v = _pca_top_component(C)

    def project(t: pa.Table) -> pa.Table:
        x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        if x.size == 0:
            x = np.zeros((0, EMBED_DIMS), dtype=np.float64)
        s = np.round((x - m[None, :]) @ v, 6)
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "pc1": pa.array(s, pa.float64()),
            }
        )

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


JSB_BUCKETS = 16


def _bucketed_join_tables(sf_dir: str) -> str:
    """One-time storage bucketing of orders + lineitem on
    orderkey & (B−1) — the Hive/Iceberg bucketed-table maintenance job.
    A distributed map writes each block's per-bucket slices as
    independent parquet files under ``table/bucket=k/`` (each writer
    owns its own uniquely-named files — no coordination, resumable by
    re-running). After this amortized rewrite, EVERY join on the key is
    shuffle-free: bucket k of one table can only match bucket k of the
    other. Memoized per (sf_dir, mtime)."""
    import tempfile
    import uuid

    lt = os.path.getmtime(_pq(sf_dir, "lineitem"))
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{lt}:{JSB_BUCKETS}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"aper_jsb_{key}")
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root

    import pyarrow.parquet as pq_

    # build under a process-unique staging dir, publish with ONE atomic
    # rename: a crashed or concurrent builder can never leave a
    # half-written (or double-written) root behind
    tmp = f"{root}.tmp-{uuid.uuid4().hex}"
    specs = (
        ("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]),
        ("lineitem", "l_orderkey",
         ["l_orderkey", "l_extendedprice", "l_discount"]),
    )
    for table, keycol, cols in specs:
        def bucket_write(t: pa.Table, table=table, keycol=keycol) -> pa.Table:
            b = pc.cast(
                pc.bit_wise_and(t[keycol], JSB_BUCKETS - 1), pa.int64()
            ).to_numpy()
            for k in np.unique(b):
                sl = t.filter(pa.array(b == k))
                d = os.path.join(tmp, table, f"bucket={int(k)}")
                os.makedirs(d, exist_ok=True)
                pq_.write_table(
                    sl, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
                )
            return pa.table({"rows": pa.array([len(t)], pa.int64())})

        _read(sf_dir, table, cols).map_batches(
            bucket_write, batch_format="pyarrow", zero_copy_batch=True
        ).sum("rows")
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, root)
    except OSError:  # another builder won the race — use theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return root


def q_join_storage_bucketed(sf_dir: str):
    """Shuffle-FREE join over storage-co-partitioned tables: after the
    one-time bucketed rewrite (``_bucketed_join_tables`` — amortized
    across every subsequent join on the key at 10^12 scale), the join
    itself moves no input rows between workers. Task k reads bucket k
    of BOTH tables directly (pyarrow reads inside the map — the
    bucket-to-bucket locality a co-partitioned lakehouse layout gives
    you), hash-joins in memory, and emits a per-priority partial
    rollup; only O(buckets × priorities) partial rows reach the final
    groupby. Result identical to join_large / join_bucketed (shared
    oracle)."""
    import pyarrow.parquet as pq_

    root = _bucketed_join_tables(sf_dir)
    ids = rd.from_items([{"bucket": k} for k in range(JSB_BUCKETS)])

    def join_bucket(t: pa.Table) -> pa.Table:
        import glob

        outs = []
        for k in t["bucket"].to_pylist():
            of = sorted(glob.glob(
                os.path.join(root, "orders", f"bucket={k}", "*.parquet")))
            lf = sorted(glob.glob(
                os.path.join(root, "lineitem", f"bucket={k}", "*.parquet")))
            if not of or not lf:
                continue
            od = pa.concat_tables([pq_.read_table(f) for f in of]).to_pandas()
            li = pa.concat_tables([pq_.read_table(f) for f in lf]).to_pandas()
            df = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
            df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
            g = (
                df.groupby("o_orderpriority")["rev"]
                .agg(["sum", "size"])
                .reset_index()
            )
            outs.append(
                pa.table(
                    {
                        "o_orderpriority": pa.array(
                            g["o_orderpriority"], pa.string()
                        ),
                        "rev": pa.array(g["sum"], pa.float64()),
                        "n": pa.array(g["size"], pa.int64()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "rev": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    agg = (
        ids.map_batches(join_bucket, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            ray.data.aggregate.Sum("rev", alias_name="revenue"),
            ray.data.aggregate.Sum("n", alias_name="n_lineitems"),
        )
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df


def q_agg_incremental(sf_dir: str):
    """Incremental aggregation by partial-state merge: 'yesterday's'
    corpus (orderkey & 3 ≠ 0) reduces once to a tiny mergeable state
    table of (group key, Σqty, Σrev, Σdisc, n) partials, persisted to
    parquet — the reusable checkpoint; 'today's' delta (orderkey & 3 =
    0) reduces to its own partials; the merge is a groupby-sum over
    O(groups × partials) rows. At 10^12 scale this is the difference
    between touching the day's arrivals and re-scanning all history.
    The result provably equals the full recompute: the oracle
    aggregates the WHOLE table in one SQL pass."""
    import tempfile

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
         "l_extendedprice", "l_discount"],
    )

    def partials(t: pa.Table, want_delta: bool) -> pa.Table:
        sel = pc.equal(pc.bit_wise_and(t["l_orderkey"], 3), 0)
        t = t.filter(sel if want_delta else pc.invert(sel))
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        acc: dict[tuple, list] = {}
        for f, s, q, r, d in zip(
            t["l_returnflag"].to_pylist(),
            t["l_linestatus"].to_pylist(),
            t["l_quantity"].to_pylist(),
            rev.to_pylist(),
            t["l_discount"].to_pylist(),
        ):
            a = acc.setdefault((f, s), [0.0, 0.0, 0.0, 0])
            a[0] += q
            a[1] += r
            a[2] += d
            a[3] += 1
        keys = list(acc.keys())
        return pa.table(
            {
                "l_returnflag": pa.array([k[0] for k in keys], pa.string()),
                "l_linestatus": pa.array([k[1] for k in keys], pa.string()),
                "qty": pa.array([acc[k][0] for k in keys], pa.float64()),
                "rev": pa.array([acc[k][1] for k in keys], pa.float64()),
                "disc": pa.array([acc[k][2] for k in keys], pa.float64()),
                "n": pa.array([acc[k][3] for k in keys], pa.int64()),
            }
        )

    state_dir = tempfile.mkdtemp(prefix="aper_aggstate_")
    li.map_batches(
        lambda t: partials(t, want_delta=False),
        batch_format="pyarrow", zero_copy_batch=True,
    ).write_parquet(state_dir)

    base_state = rd.read_parquet(state_dir)  # the persisted checkpoint
    delta = li.map_batches(
        lambda t: partials(t, want_delta=True),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    merged = (
        base_state.union(delta)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            ray.data.aggregate.Sum("qty", alias_name="sum_qty"),
            ray.data.aggregate.Sum("rev", alias_name="sum_revenue"),
            ray.data.aggregate.Sum("disc", alias_name="sum_disc"),
            ray.data.aggregate.Sum("n", alias_name="n"),
        )
    )
    df = merged.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_revenue"] = df["sum_revenue"].round(2)
    df["avg_disc"] = (df["sum_disc"] / df["n"]).round(6)
    return df.drop(columns=["sum_disc"])


def q_domain_entropy(sf_dir: str):
    """Corpus concentration audit: Shannon entropy (nats) + top-source
    share of the per-source document distribution — the one-row balance
    check a training-mix pipeline runs before sampling (a corpus whose
    entropy is far below ln(n_sources) is dominated by few crawl
    sources). One groupby-count reduces the corpus to O(sources) exact
    integer rows; the driver finish is H = ln(N) − (Σ c·ln c)/N from
    those integers — the identical float64 formula the oracle runs."""
    rows = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .count()
        .take_all()  # bounded: one row per source
    )
    counts = [int(r["count()"]) for r in rows]
    total = sum(counts)
    ent = math.log(total) - sum(c * math.log(c) for c in counts) / total
    return pa.table(
        {
            "n_sources": pa.array([len(counts)], pa.int64()),
            "entropy_nats": pa.array([round(ent, 6)], pa.float64()),
            "top_share": pa.array(
                [round(max(counts) / total, 6)], pa.float64()
            ),
        }
    )


COPY_SEARCH_K = 10


def q_copy_search(sf_dir: str):
    """Broadcast-query containment scan: the 10 documents sharing the
    most 3-token shingles with a query document (the min-doc_id doc) —
    the 'find copies / derivatives of THIS doc' primitive behind
    plagiarism and benchmark-contamination search. The query shingle set
    is built from ONE row (distributed min + single-row filter take,
    both bounded) and captured in the scoring closure (a few hundred
    strings — plain values, restart-safe, no per-batch reshipping by
    Ray's closure capture); each batch scores its docs with integer set
    intersections, and the global top-K uses the per-block partial
    top-K reduce (``stages/topk.py``) — no global sort, no shuffle of
    the corpus. Ties break on doc_id ascending, deterministically."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    qid = int(docs.min("doc_id"))
    qtext = docs.filter(expr=f"doc_id == {qid}").take(1)[0]["text"]
    qset = set(dd._shingles(qtext or ""))
    n_query = len(qset)

    def score(t: pa.Table) -> pa.Table:
        out_id, out_c = [], []
        for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if i == qid:
                continue
            out_id.append(i)
            out_c.append(len(qset.intersection(dd._shingles(txt or ""))))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_common": pa.array(out_c, pa.int64()),
                "n_query": pa.array([n_query] * len(out_id), pa.int64()),
            }
        )

    from ..stages.topk import dataset_topk

    return dataset_topk(
        docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        [("n_common", "descending"), ("doc_id", "ascending")],
        COPY_SEARCH_K,
    )


def q_signal_correlation(sf_dir: str):
    """Pearson correlation matrix over per-doc quality signals (chars,
    whitespace tokens, distinct tokens a.k.a. types) — the redundancy
    audit run before
    wiring signals into a filter ensemble (two signals correlated at
    0.98 double-count in a logit). One stateless pass emits ONE integer
    moment row per batch (Σx, Σx², Σxy per pair, n — exact int64
    arithmetic, values bounded by n·len²); a constant-key groupby sums
    the partials, and the 3 output rows divide exact integer moments in
    float64 — bit-identical to the oracle's replay of
    (n·Σxy − ΣxΣy) / (√(n·Σx²−Σx²_sum) · √(n·Σy²−Σy²_sum)).
    Zero-variance signals (undefined correlation) emit 0.0 on both
    sides."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def moments(t: pa.Table) -> pa.Table:
        text = t["text"]
        c = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy()
        tk = pc.cast(
            pc.count_substring_regex(text, pattern=r"\S+"), pa.int64()
        ).to_numpy()
        ln = np.array(
            [len(set(dd._tokens(s or ""))) for s in text.to_pylist()],
            dtype=np.int64,
        )
        cols = {"n": len(c)}
        for name, arr in (("c", c), ("t", tk), ("l", ln)):
            cols[f"s_{name}"] = int(arr.sum())
            cols[f"s_{name}{name}"] = int((arr.astype(object) * arr).sum())
        for a, b in (("c", "t"), ("c", "l"), ("t", "l")):
            x = {"c": c, "t": tk, "l": ln}[a].astype(object)
            y = {"c": c, "t": tk, "l": ln}[b]
            cols[f"s_{a}{b}"] = int((x * y).sum())
        return pa.table({k: pa.array([v], pa.int64()) for k, v in cols.items()})

    agg_cols = [
        "n", "s_c", "s_t", "s_l", "s_cc", "s_tt", "s_ll",
        "s_ct", "s_cl", "s_tl",
    ]
    red = ds.map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        *[ray.data.aggregate.Sum(c, alias_name=c) for c in agg_cols]
    )
    n = int(red["n"])
    s = {k: int(red[k]) for k in agg_cols}
    names = {"c": "chars", "t": "tokens", "l": "types"}
    out_a, out_b, out_r = [], [], []
    for a, b in (("c", "t"), ("c", "l"), ("t", "l")):
        num = n * s[f"s_{a}{b}"] - s[f"s_{a}"] * s[f"s_{b}"]
        da = n * s[f"s_{a}{a}"] - s[f"s_{a}"] * s[f"s_{a}"]
        db = n * s[f"s_{b}{b}"] - s[f"s_{b}"] * s[f"s_{b}"]
        out_a.append(names[a])
        out_b.append(names[b])
        if da == 0 or db == 0:
            out_r.append(0.0)
        else:
            out_r.append(
                float(
                    np.round(float(num) / (math.sqrt(da) * math.sqrt(db)), 6)
                )
            )
    return pa.table(
        {
            "sig_a": pa.array(out_a, pa.string()),
            "sig_b": pa.array(out_b, pa.string()),
            "corr": pa.array(out_r, pa.float64()),
        }
    )


def q_snapshot_editdist(sf_dir: str):
    """Crawl-over-crawl change MAGNITUDE: for every url present in both
    snapshots, the byte-level Levenshtein distance between the two
    texts (first-{cap}-chars window — documented truncation, shared with
    the oracle) — the refresh-priority signal an incremental crawler
    feeds its scheduler (dist 0 = unchanged, small = tweak, large =
    rewrite). Same bounded-group plan as snapshot_diff: union tagged by
    side, ONE groupby(url) with ≤2 rows per group, DP inside the group
    (vectorized numpy rows). Integer-exact."""
    a_dir, b_dir = crawl_diff_corpus()

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.int32())
            )

        return f

    a = rd.read_parquet(a_dir, columns=["url", "text"]).map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    )
    b = rd.read_parquet(b_dir, columns=["url", "text"]).map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True
    )

    def dist(g: pa.Table) -> pa.Table:
        sides = dict(zip(g["side"].to_pylist(), g["text"].to_pylist()))
        if 0 not in sides or 1 not in sides:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "editdist": pa.array([], pa.int64()),
                }
            )
        d = _lev_bytes(
            (sides[0] or "")[:EDITDIST_CAP].encode("utf-8"),
            (sides[1] or "")[:EDITDIST_CAP].encode("utf-8"),
        )
        return pa.table(
            {
                "url": pa.array([g["url"][0].as_py()], pa.string()),
                "editdist": pa.array([d], pa.int64()),
            }
        )

    return a.union(b).groupby("url").map_groups(
        dist, batch_format="pyarrow"
    )


def q_domain_similarity(sf_dir: str):
    """Pairwise vocabulary similarity BETWEEN sources via mergeable
    per-domain MinHash: a domain's signature is the elementwise min of
    its docs' signatures (= the signature of the union of their shingle
    sets — a true mergeable sketch, so per-block partials compose by
    min). Per-batch actor partials emit (source, p_idx, mh) rows
    (sources × NUM_PERM per block), a groupby-min reduces them, and the
    bounded sources × NUM_PERM final table drives the pairwise
    signature-agreement estimate J ≈ agree/NUM_PERM on the driver. The
    Broder estimator over domain-level sketches is how you compare
    corpus slices (crawls, domains, languages) without pairing documents.
    md5+mod-2⁶⁴ arithmetic replayed exactly in SQL; sources consisting
    solely of token-free docs are absent on both sides (the empty
    shingle set is the min-identity and is skipped —
    ``dd.DomainMinHasher``)."""
    rows = (
        _read(sf_dir, "documents", ["source", "text"])
        .map_batches(
            dd.DomainMinHasher,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=_apool(),
        )
        .groupby(["source", "p_idx"])
        .min("mh")
        .take_all()  # bounded: n_sources × NUM_PERM rows
    )
    sigs: dict[str, np.ndarray] = {}
    for r in rows:
        sigs.setdefault(
            r["source"], np.zeros(dd.NUM_PERM, dtype=np.uint64)
        )[int(r["p_idx"])] = np.uint64(
            int(r["min(mh)"]) + dd.DomainMinHasher.BIAS
        )
    srcs = sorted(sigs)
    out_a, out_b, out_ag, out_j = [], [], [], []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            agree = int((sigs[srcs[i]] == sigs[srcs[j]]).sum())
            out_a.append(srcs[i])
            out_b.append(srcs[j])
            out_ag.append(agree)
            out_j.append(round(agree / dd.NUM_PERM, 6))
    return pa.table(
        {
            "src_a": pa.array(out_a, pa.string()),
            "src_b": pa.array(out_b, pa.string()),
            "agree": pa.array(out_ag, pa.int64()),
            "est_jaccard": pa.array(out_j, pa.float64()),
        }
    )


ZIPF_TOP_K = 50


def q_zipf_slope(sf_dir: str):
    """Zipf log-log slope of the top-K term frequencies — the one-row
    corpus-health audit (natural text sits near −1; a flat or cliffed
    slope flags boilerplate floods or truncated vocabularies). The
    count plan is vocab_top_terms' (partial counts → groupby sum →
    per-block top-K; the billion-term vocabulary never materializes);
    the driver regression runs on ≤K exact integer counts with
    x = ln(rank), y = ln(n) and the same closed-form least-squares
    formula the oracle replays — ranks tie-broken (n desc, term asc)
    deterministically on both sides."""

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

    agg = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )
    top = dataset_topk(
        agg, [("n", "descending"), ("term", "ascending")], ZIPF_TOP_K
    ).take_all()
    k = len(top)
    x = [math.log(r + 1) for r in range(k)]
    y = [math.log(int(t["n"])) for t in top]
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    den = k * sxx - sx * sx
    slope = 0.0 if den == 0 else round((k * sxy - sx * sy) / den, 6)
    return pa.table(
        {
            "k_terms": pa.array([k], pa.int64()),
            "slope": pa.array([slope], pa.float64()),
        }
    )


def q_first_seen(sf_dir: str):
    """Canonical-source attribution across recrawls: for every distinct
    content fingerprint, the earliest capture timestamp, the canonical
    url (min url among earliest-ts ties — deterministic), and the copy
    count. This is the provenance step of crawl dedup: when N urls carry
    the same bytes, the keeper is the earliest capture. AGGREGATE-only
    plan — no map_groups ever buffers a duplicate set (a boilerplate
    page with 10⁹ captures is ONE group): pass 1 reduces each
    fingerprint to (min ts, count) via combining aggregates; the
    earliest-tie canonical url resolves by joining the tiny winners
    table back on fp, filtering to ts == first, and taking Min(url) —
    the join moves each capture row once, the aggregates combine
    per-block."""
    pages_dir = recrawl_corpus()

    def fp(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((x or "").encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "fp": pa.array(fps, pa.string()),
                "url": t["url"],
                "ts_us": pc.cast(
                    pc.cast(t["warc_ts"], pa.timestamp("us")), pa.int64()
                ),
            }
        )

    rows = rd.read_parquet(
        pages_dir, columns=["url", "warc_ts", "text"]
    ).map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
    winners = (
        rows.groupby("fp")
        .aggregate(
            ray.data.aggregate.Min("ts_us", alias_name="first_us"),
            ray.data.aggregate.Count(alias_name="n_captures"),
        )
    )
    joined = sj.safe_join(
        rows, winners, join_type="inner",
        num_partitions=dd.adaptive_partitions(
            max(rows.count(), 1)
        ),
        on=("fp",),
    )

    def earliest_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["ts_us"], t["first_us"]))

    out = (
        joined.map_batches(
            earliest_only, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("fp")
        .aggregate(
            ray.data.aggregate.Min("url", alias_name="canonical_url"),
            ray.data.aggregate.Min("first_us", alias_name="first_us"),
            ray.data.aggregate.Min("n_captures", alias_name="n_captures"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fp": t["fp"],
                "first_ts": pc.cast(
                    pc.cast(t["first_us"], pa.timestamp("us")),
                    pa.timestamp("us"),
                ),
                "canonical_url": t["canonical_url"],
                "n_captures": pc.cast(t["n_captures"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


CORPUS_KL_TOP_K = 50


def q_corpus_kl(sf_dir: str):
    """Per-source KL divergence of the term distribution vs the corpus
    (over the global top-K terms, add-1 smoothed) — the domain-shift
    audit behind DSIR-style mixture decisions: a source whose KL is an
    outlier writes a different language than the pool. Pass 1 builds
    the bounded top-K term set (vocab partial-count plan, the
    billion-term vocabulary never materializes); pass 2 counts
    (source, top-term) occurrences — the groupby key space is
    sources × K. The driver finish computes KL from exact integer
    counts with the identical float64 formula the oracle replays."""

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

    docs = _read(sf_dir, "documents", ["source", "text"])
    agg = (
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("term")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )
    top = dataset_topk(
        agg, [("n", "descending"), ("term", "ascending")], CORPUS_KL_TOP_K
    ).take_all()
    terms = sorted(t["term"] for t in top)
    term_set = set(terms)

    def st_partial(t: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for src, s in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for w in (s or "").split(" "):
                if w in term_set:
                    counts[(src, w)] = counts.get((src, w), 0) + 1
        keys = list(counts.keys())
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], pa.string()),
                "term": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    rows = (
        docs.map_batches(st_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby(["source", "term"])
        .sum("n")
        .take_all()  # bounded: sources × K rows
    )
    st: dict[str, dict[str, int]] = {}
    for r in rows:
        st.setdefault(r["source"], {})[r["term"]] = int(r["sum(n)"])
    gl = {t: sum(d.get(t, 0) for d in st.values()) for t in terms}
    nn = sum(gl.values())
    k = len(terms)
    out_s, out_kl = [], []
    for src in sorted(st):
        ns = sum(st[src].values())
        kl = 0.0
        for t in terms:
            p = (st[src].get(t, 0) + 1) / (ns + k)
            qv = (gl[t] + 1) / (nn + k)
            kl += p * math.log(p / qv)
        out_s.append(src)
        out_kl.append(round(kl, 6))
    return pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "kl": pa.array(out_kl, pa.float64()),
        }
    )


SESSION_PATH_TOP_K = 20


def q_session_paths(sf_dir: str):
    """Session-path sequence mining: the top-K most frequent event-type
    paths ('view>click>purchase') across all sessions — the behavioral
    template table behind funnel design and bot-pattern triage. One
    shuffle keyed by user (bounded per-user history, sessionize's
    partitioning contract); inside the group, events sort by
    (ts, event_id) — the deterministic tie order — sessions split on
    gap > SESSION_GAP_S, and a per-group Counter emits (path, n)
    partials; a groupby-sum over the path key space plus the per-block
    partial top-K reduce finish it. Integer-exact."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def paths(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        ts = pc.cast(
            g["ts"].take(idx), pa.timestamp("us")
        ).cast(pa.int64()).to_numpy()
        types = g["event_type"].take(idx).to_pylist()
        c: Counter = Counter()
        cur: list[str] = []
        for i, ty in enumerate(types):
            if cur and ts[i] - ts[i - 1] > SESSION_GAP_S * 1_000_000:
                c[">".join(cur)] += 1
                cur = []
            cur.append(ty)
        if cur:
            c[">".join(cur)] += 1
        return pa.table(
            {
                "path": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    from ..stages.topk import dataset_topk

    agg = (
        ds.groupby("user_id")
        .map_groups(paths, batch_format="pyarrow")
        .groupby("path")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )
    return dataset_topk(
        agg, [("n", "descending"), ("path", "ascending")],
        SESSION_PATH_TOP_K,
    )


def q_event_anomaly(sf_dir: str):
    """Hourly-volume anomaly audit: flag hours whose event count
    deviates from the median by more than 3× the median absolute
    deviation — the robust ops check a streaming ingest runs per
    partition-hour. The corpus reduces to one exact integer count per
    hour (int64 epoch-hour keys, the repo-wide bucket convention);
    median/MAD are a driver finish over the bounded hour table, and
    every hour is emitted with its flag (deterministic, nonempty).
    Both sides compute median as the even-count midpoint average in
    float64."""
    rows = (
        _read(sf_dir, "events", ["ts"])
        .map_batches(
            lambda t: pa.table(
                {
                    "hour": pc.divide(
                        pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()),
                        3_600_000_000,
                    )
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby("hour")
        .count()
        .take_all()  # bounded: one row per hour of corpus time span
    )
    import statistics

    hours = sorted((int(r["hour"]), int(r["count()"])) for r in rows)
    med = float(statistics.median([n for _, n in hours]))
    mad = float(statistics.median([abs(n - med) for _, n in hours]))
    return pa.table(
        {
            "hour": pa.array([h for h, _ in hours], pa.int64()),
            "n": pa.array([n for _, n in hours], pa.int64()),
            "is_outlier": pa.array(
                [1 if abs(n - med) > 3 * mad else 0 for _, n in hours],
                pa.int64(),
            ),
        }
    )


def q_audience_overlap(sf_dir: str):
    """User-audience Jaccard between event types ('what share of
    clickers also purchase') — the overlap matrix behind cohort and
    cannibalization analysis. One shuffle keyed by user; the per-user
    group emits its distinct-type pairs and singletons (≤ types² tiny
    rows per user), a groupby-sum reduces them to the bounded
    types×types key space, and the driver divides exact integers:
    J = n_both / (n_a + n_b − n_both), rounded 6."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        types = sorted(set(g["event_type"].to_pylist()))
        a_out, b_out = [], []
        for i, a in enumerate(types):
            a_out.append(a)
            b_out.append("")  # singleton marker: distinct-user total
            for b in types[i + 1:]:
                a_out.append(a)
                b_out.append(b)
        return pa.table(
            {
                "a": pa.array(a_out, pa.string()),
                "b": pa.array(b_out, pa.string()),
                "n": pa.array([1] * len(a_out), pa.int64()),
            }
        )

    rows = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["a", "b"])
        .sum("n")
        .take_all()  # bounded: event_types² keys
    )
    totals = {r["a"]: int(r["sum(n)"]) for r in rows if r["b"] == ""}
    out_a, out_b, out_n, out_j = [], [], [], []
    for r in sorted(
        (r for r in rows if r["b"] != ""), key=lambda r: (r["a"], r["b"])
    ):
        a, b, nb = r["a"], r["b"], int(r["sum(n)"])
        union = totals[a] + totals[b] - nb
        out_a.append(a)
        out_b.append(b)
        out_n.append(nb)
        out_j.append(round(nb / union, 6))
    return pa.table(
        {
            "type_a": pa.array(out_a, pa.string()),
            "type_b": pa.array(out_b, pa.string()),
            "n_both": pa.array(out_n, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


PROFILE_COLUMNS = [
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
]


def q_profile_table(sf_dir: str):
    """Data-profiling audit of the orders table: per column, row count,
    null count and EXACT distinct count — the schema-drift check a
    lakehouse maintenance job runs per partition before promoting it.
    Null counts come from one streaming pass of integer partials; ALL
    columns' exact distinct counts come from one further scan that
    emits per-batch-distinct (column, md5-of-native-repr) pairs — the
    hash is engine-internal (never compared against SQL-rendered
    values, so no cross-engine float/timestamp formatting hazard) —
    dedupped by one groupby and counted by a counter-sized second one.
    At 10^12 rows the exact distinct is the documented heavy path; the
    one-pass deterministic KMV estimate (approx_distinct_kmv) is the
    scale alternative, and profile jobs run per-partition where
    exactness is cheap. Integer-exact output."""
    ds = _read(sf_dir, "orders", PROFILE_COLUMNS)
    n_rows = ds.count()

    def null_partials(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "column": pa.array(PROFILE_COLUMNS, pa.string()),
                "n_null": pa.array(
                    [t[c].null_count for c in PROFILE_COLUMNS], pa.int64()
                ),
            }
        )

    nulls = {
        r["column"]: int(r["sum(n_null)"])
        for r in ds.map_batches(
            null_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("column")
        .sum("n_null")
        .take_all()
    }
    nulls = {c: nulls.get(c, 0) for c in PROFILE_COLUMNS}

    # all columns' exact distinct counts from ONE table scan: each batch
    # emits its distinct (column, md5-of-native-value) pairs (the hash
    # is engine-internal — never compared against SQL-rendered values),
    # one groupby dedups pairs globally, one counter-sized groupby
    # counts per column
    def value_hashes(t: pa.Table) -> pa.Table:
        cols_out, hashes_out = [], []
        for c in PROFILE_COLUMNS:
            seen = {
                hashlib.md5(repr(v).encode("utf-8")).hexdigest()
                for v in t[c].to_pylist()
                if v is not None
            }
            cols_out.extend([c] * len(seen))
            hashes_out.extend(seen)
        return pa.table(
            {
                "column": pa.array(cols_out, pa.string()),
                "h": pa.array(hashes_out, pa.string()),
            }
        )

    distinct = {
        r["column"]: int(r["count()"])
        for r in ds.map_batches(
            value_hashes, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["column", "h"])
        .count()
        .groupby("column")
        .count()
        .take_all()
    }
    return pa.table(
        {
            "column": pa.array(PROFILE_COLUMNS, pa.string()),
            "n_rows": pa.array([n_rows] * len(PROFILE_COLUMNS), pa.int64()),
            "n_null": pa.array(
                [nulls[c] for c in PROFILE_COLUMNS], pa.int64()
            ),
            "n_distinct": pa.array(
                [distinct.get(c, 0) for c in PROFILE_COLUMNS], pa.int64()
            ),
        }
    )


K_ANON = 10


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit over the (nation, market segment)
    quasi-identifier pair of the customer table: every equivalence
    class with its size and an at-risk flag (size < k) — the
    re-identification check run before releasing a partition. One
    groupby over the bounded quasi-identifier key space; exact
    integers."""
    return (
        _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])
        .groupby(["c_nationkey", "c_mktsegment"])
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                    "c_mktsegment": t["c_mktsegment"],
                    "n": pc.cast(t["count()"], pa.int64()),
                    "at_risk": pc.cast(
                        pc.less(t["count()"], K_ANON), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


L_DIV = 3
LDIV_BUCKET = 500


def q_l_diversity(sf_dir: str):
    """l-diversity audit over the (source, lang) quasi-identifier of
    the documents table with the length bucket (n_chars // 500) as the
    sensitive attribute: a class that is k-anonymous but where every
    member shares one sensitive value still leaks (Machanavajjhala et
    al., ICDE'06) — at_risk flags classes with < L_DIV distinct
    buckets. Two bounded groupbys: distinct (QI, bucket) triples
    first, then per-QI rollup; class sizes ride along from the same
    scan. Pure integers, no row leaves as more than a counter."""
    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        b = pc.divide(pc.cast(t["n_chars"], pa.int64()),
                      pa.scalar(LDIV_BUCKET, pa.int64()))
        return pa.table(
            {"source": t["source"], "lang": t["lang"], "sb": b}
        )

    triples = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang", "sb"])
        .count()
    )

    def rollup(g: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.cast(g["count()"], pa.int64())).as_py())
        ndist = g.num_rows
        return pa.table(
            {
                "source": g["source"].slice(0, 1),
                "lang": g["lang"].slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "n_sensitive": pa.array([ndist], pa.int64()),
                "at_risk": pa.array([1 if ndist < L_DIV else 0],
                                    pa.int64()),
            }
        )

    return triples.groupby(["source", "lang"]).map_groups(
        rollup, batch_format="pyarrow"
    )


L_DIVERSITY_SQL = f"""
with b as (select source, lang, n_chars // {LDIV_BUCKET} as sb
           from documents),
d as (select source, lang, sb, count(*)::bigint as c from b
      group by 1, 2, 3)
select source, lang, sum(c)::bigint as n,
       count(*)::bigint as n_sensitive,
       (count(*) < {L_DIV})::bigint as at_risk
from d group by source, lang
"""


def q_markov_perplexity(sf_dir: str):
    """Per-user sequence negative log-likelihood under the corpus
    event-type bigram chain — the behavioral anomaly score (a session
    that the crowd's transition model finds surprising is bot-like or
    broken instrumentation). The transition table is the distributed
    part (one user shuffle, O(types²) rows); its probabilities become
    a tiny broadcast closure, and a second user-partitioned pass
    scores each history in place: nll = Σ c_ab·(ln tot_a − ln n_ab).
    Every observed pair exists in the corpus table by construction, so
    no smoothing term is needed."""
    tr = q_event_transitions(sf_dir).take_all()  # O(types²), bounded
    n_ab = {(r["prev_type"], r["next_type"]): r["n"] for r in tr}
    tot: dict[str, int] = {}
    for (a, _), n in n_ab.items():
        tot[a] = tot.get(a, 0) + n

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        types = g["event_type"].take(idx).to_pylist()
        c = Counter(zip(types, types[1:]))
        n_tr = sum(c.values())
        if n_tr == 0:
            # single-event user: no transition pairs, so the oracle's
            # inner join through the lag-pair CTE drops them — match it
            return pa.table(
                {
                    "user_id": g["user_id"].slice(0, 0),
                    "n_transitions": pa.array([], pa.int64()),
                    "nll_nats": pa.array([], pa.float64()),
                    "avg_nll": pa.array([], pa.float64()),
                }
            )
        nll = float(
            sum(
                k * (math.log(tot[a]) - math.log(n_ab[(a, b)]))
                for (a, b), k in c.items()
            )
        )
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1),
                "n_transitions": pa.array([n_tr], pa.int64()),
                "nll_nats": pa.array([round(nll, 6)], pa.float64()),
                "avg_nll": pa.array(
                    [round(nll / n_tr, 6) if n_tr else 0.0], pa.float64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow"
    )


PRUNE_NCHARS = 300  # predicate: n_chars > PRUNE_NCHARS
PRUNE_RG_ROWS = 64  # row-group size of the audit mirror


def rowgroup_corpus(sf_dir: str) -> str:
    """Multi-row-group mirror of the documents table (row groups of
    PRUNE_RG_ROWS rows, CLUSTERED on n_chars so min/max stats are
    tight windows — the layout a lake actually ships when it sorts on
    its pruning key) — the fixture for the pruning audit; the sf
    tables ship as one row group, which makes the audit trivially
    1 row. mtime-keyed, either side can write it first."""
    import tempfile

    import pyarrow.parquet as pq_

    src = _pq(sf_dir, "documents")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}:{PRUNE_RG_ROWS}:v2".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"aper_rg_{key}")
    path = os.path.join(out, "documents.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out, exist_ok=True)
    t = pq_.read_table(src, columns=["doc_id", "n_chars"])
    t = t.sort_by([("n_chars", "ascending"), ("doc_id", "ascending")])
    tmp = path + ".tmp"
    pq_.write_table(t, tmp, row_group_size=PRUNE_RG_ROWS)
    os.replace(tmp, path)
    return path


def q_rowgroup_prune(sf_dir: str):
    """Row-group pruning audit — METADATA ONLY, zero data scan: for
    the predicate n_chars > PRUNE_NCHARS, a row group whose column
    max ≤ threshold is skippable at the reader, and this query reports
    each group's stats and prunability from the parquet footer alone.
    This is the measurement behind 'prune at the read': on a 100 TB
    lake the same footers-only pass (one tiny read per file, fanned
    out in map_batches over the file LIST) predicts scan savings
    before any scan runs. The oracle replays it from DuckDB's
    parquet_metadata() over the same mirror."""
    path = rowgroup_corpus(sf_dir)
    import pyarrow.parquet as pq_

    md = pq_.ParquetFile(path).metadata
    rg_ids, n_rows, mins, maxs, prun = [], [], [], [], []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for ci in range(rg.num_columns):
            col = rg.column(ci)
            if col.path_in_schema == "n_chars":
                st = col.statistics
                rg_ids.append(g)
                n_rows.append(rg.num_rows)
                mins.append(int(st.min))
                maxs.append(int(st.max))
                prun.append(1 if st.max <= PRUNE_NCHARS else 0)
    return pa.table(
        {
            "row_group_id": pa.array(rg_ids, pa.int64()),
            "n_rows": pa.array(n_rows, pa.int64()),
            "min_n_chars": pa.array(mins, pa.int64()),
            "max_n_chars": pa.array(maxs, pa.int64()),
            "prunable": pa.array(prun, pa.int64()),
        }
    )


def csv_corpus(sf_dir: str) -> str:
    """Lazily write the CSV mirror of the documents table's metadata
    columns (doc_id, source, lang, n_chars — no free text, so no
    dialect/quoting ambiguity): the fixture for the CSV source path.
    Keyed by the parquet's mtime; both the query and the oracle
    composer call this, so either side can run first."""
    import tempfile

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq_

    src = _pq(sf_dir, "documents")
    key = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"aper_csv_{key}")
    path = os.path.join(out, "documents.csv")
    if os.path.exists(path):
        return path
    os.makedirs(out, exist_ok=True)
    t = pq_.read_table(src, columns=["doc_id", "source", "lang",
                                     "n_chars"])
    tmp = path + ".tmp"
    pacsv.write_csv(t, tmp)
    os.replace(tmp, path)
    return path


def q_csv_roundtrip(sf_dir: str):
    """CSV source coverage: `ray.data.read_csv` over the metadata
    mirror, one vectorized pass deriving the length bucket — proves
    the engine ingests the third major interchange format (parquet and
    JSONL already covered) through the same Dataset pipeline. CSV
    blocks split at the reader like any other source; downstream
    stages are format-blind."""
    path = csv_corpus(sf_dir)

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "lang": t["lang"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "len_bucket": pc.divide(
                    pc.cast(t["n_chars"], pa.int64()),
                    pa.scalar(100, pa.int64()),
                ),
            }
        )

    return rd.read_csv(path).map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )


def q_dedup_phash_clusters(sf_dir: str):
    """Image near-dup CLUSTERS: connected components over the verified
    perceptual-hash pair graph (``media_phash_pairs``) — the grouping
    step an image-dedup pipeline runs before keep-one-per-cluster.
    Size-routed components (``stages/dedup.connected_components``):
    union-find task under the edge cap, log-round min-label propagation
    above; every endpoint labeled with its component's MIN doc_id."""
    pairs = q_media_phash_pairs(sf_dir).select_columns(["a", "b"])
    return dd.connected_components(pairs)


def q_monthly_growth(sf_dir: str):
    """Month-over-month revenue growth of orders — the seasonality /
    drift audit of an ingest ledger. One groupby over the bounded
    (year·100+month) key space with per-batch revenue partials; the
    growth ratio is a driver finish over the bounded month table,
    computed FROM THE 2-dp-ROUNDED monthly revenues (both engines round
    the month sums first, so the ratio divides identical doubles —
    no float-sum-order hazard reaches the output). Emits months that
    HAVE a predecessor (inner-lag shape)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partials(t: pa.Table) -> pa.Table:
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(t["o_orderdate"]), pa.int64()), 100),
            pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
        )
        return pa.table({"ym": ym, "rev": t["o_totalprice"]})

    rows = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("ym")
        .sum("rev")
        .take_all()  # bounded: one row per calendar month
    )
    months = sorted((int(r["ym"]), round(float(r["sum(rev)"]), 2))
                    for r in rows)
    out_ym, out_rev, out_g = [], [], []
    for (pm, prev), (m, rev) in zip(months, months[1:]):
        out_ym.append(m)
        out_rev.append(rev)
        out_g.append(round(rev / prev - 1.0, 6))
    return pa.table(
        {
            "ym": pa.array(out_ym, pa.int64()),
            "revenue": pa.array(out_rev, pa.float64()),
            "growth": pa.array(out_g, pa.float64()),
        }
    )


def q_lang_confusion(sf_dir: str):
    """Declared-vs-predicted language agreement matrix — the label-noise
    audit run before trusting crawl-provided lang tags (CCNet drops
    pages whose header language disagrees with the classifier). Reuses
    the lang_id heuristic per batch, carries the declared tag alongside
    (same row order), and reduces to the bounded langs × predictions
    key space. Integer-exact."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def pair(t: pa.Table) -> pa.Table:
        pred = tx.lang_id_batch(t)
        return pa.table(
            {
                "lang": t["lang"],
                "predicted_lang": pred["predicted_lang"],
                "n": pa.array([1] * t.num_rows, pa.int64()),
            }
        )

    return (
        ds.map_batches(pair, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "predicted_lang"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )


def q_dedup_funnel(sf_dir: str):
    """Curation-funnel audit: survivor counts after each stage of the
    curate chain (input → quality gate → language gate → exact dedup) —
    the per-stage accounting a 100 TB curation run reports so a
    mis-tuned filter is visible BEFORE the expensive downstream stages
    run. Stages 0–2 reduce to three integer counters in one streaming
    pass (per-batch partials, constant-key sum); stage 3 is the
    distinct-fingerprint count of the survivors (one groupby on the
    16-byte md5). Integer-exact."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def staged(t: pa.Table) -> pa.Table:
        q = tx.quality_batch(t)
        lang = tx.lang_id_batch(t)
        ok_q = pc.greater_equal(q["n_tokens"], 20)
        ok_l = pc.and_(ok_q, pc.equal(lang["predicted_lang"], "en"))
        return pa.table(
            {
                "n0": pa.array([t.num_rows], pa.int64()),
                "n1": pa.array([pc.sum(pc.cast(ok_q, pa.int64())).as_py()
                                or 0], pa.int64()),
                "n2": pa.array([pc.sum(pc.cast(ok_l, pa.int64())).as_py()
                                or 0], pa.int64()),
            }
        )

    agg = ds.map_batches(
        staged, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        ray.data.aggregate.Sum("n0", alias_name="n0"),
        ray.data.aggregate.Sum("n1", alias_name="n1"),
        ray.data.aggregate.Sum("n2", alias_name="n2"),
    )

    def survivors(t: pa.Table) -> pa.Table:
        q = tx.quality_batch(t)
        lang = tx.lang_id_batch(t)
        h = tx.content_hash_batch(t)
        keep = pc.and_(
            pc.greater_equal(q["n_tokens"], 20),
            pc.equal(lang["predicted_lang"], "en"),
        )
        return pa.table({"content_md5": h["content_md5"]}).filter(keep)

    n3 = (
        ds.map_batches(survivors, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("content_md5")
        .count()
        .count()
    )
    return pa.table(
        {
            "stage": pa.array(
                ["input", "quality", "lang", "exact_dedup"], pa.string()
            ),
            "stage_idx": pa.array([0, 1, 2, 3], pa.int64()),
            "n": pa.array(
                [int(agg["n0"]), int(agg["n1"]), int(agg["n2"]), n3],
                pa.int64(),
            ),
        }
    )
