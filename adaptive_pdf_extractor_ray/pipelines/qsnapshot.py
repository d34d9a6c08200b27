"""Time-travel snapshot reads, politeness scheduling, quality rule ensemble (session 20).

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
    CRAWL_DELAY_S, _read, _table_rows,
)
from .qdedup import (  # noqa: F401
    _grouped_count,
)
from .qgraph import (  # noqa: F401
    LINK_ANCHOR_RE, link_corpus, recrawl_corpus,
)
from .qpii import (  # noqa: F401
    SNAPSHOT_ASOF_TS,
)



def q_snapshot_asof(sf_dir: str):
    """Time-travel read over the re-crawl corpus: for each url, the
    LATEST capture at-or-before a fixed reference instant — the
    "corpus as of T" view every reproducible-dataset release needs
    (the Wayback/lakehouse as-of semantics, sibling of
    `snapshot_latest`'s freshest-capture and `scd2_intervals`'
    interval form). Urls first captured after T drop out entirely. One
    groupby(url) whose group is a url's revision history — bounded by
    crawl frequency, never corpus-sized."""
    import calendar
    import datetime as _dtm

    d = _dtm.datetime.fromisoformat(SNAPSHOT_ASOF_TS)
    cutoff = calendar.timegm(d.utctimetuple()) * 1_000_000
    pages = rd.read_parquet(
        recrawl_corpus(), columns=["url", "warc_ts", "text"]
    )

    def pre(t: pa.Table) -> pa.Table:
        us = pc.cast(t["warc_ts"], pa.int64())
        return t.filter(pc.less_equal(us, pa.scalar(cutoff, pa.int64())))

    def asof(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("warc_ts", "descending")]
        )
        return g.take(idx.slice(0, 1))

    return (
        pages.map_batches(pre, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("url")
        .map_groups(asof, batch_format="pyarrow")
    )


def q_crawl_schedule(sf_dir: str):
    """Per-host politeness schedule: within each host, urls are ranked
    (longer text first — the value-ordered fetch queue — tie by url)
    and fetch_offset_s = (rank-1) × CRAWL_DELAY_S, the earliest time a
    single-connection polite crawler may issue the fetch. The
    partitioning unit is the HOST QUEUE — its length is bounded
    upstream by the per-host budget (`crawl_budget`'s sublinear
    allocation), which is what makes the per-group ranking safe at
    10^12 urls; hosts shard independently. One host-keyed shuffle."""
    pages = rd.read_parquet(link_corpus(), columns=["url", "text"])

    def feats(t: pa.Table) -> pa.Table:
        hosts = pc.replace_substring_regex(
            t["url"], pattern=r"^https?://([^/]+)/.*$",
            replacement=r"\1",
        )
        return pa.table(
            {
                "host": hosts,
                "url": t["url"],
                "n_chars": pc.cast(
                    pc.utf8_length(t["text"]), pa.int64()
                ),
            }
        )

    def rank(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("n_chars", "descending"), ("url", "ascending")]
        )
        g = g.take(idx)
        n = g.num_rows
        return pa.table(
            {
                "host": g["host"],
                "url": g["url"],
                "fetch_rank": pa.array(range(1, n + 1), pa.int64()),
                "fetch_offset_s": pa.array(
                    [i * CRAWL_DELAY_S for i in range(n)], pa.int64()
                ),
            }
        )

    return (
        pages.map_batches(feats, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("host")
        .map_groups(rank, batch_format="pyarrow")
    )


def q_quality_composite(sf_dir: str):
    """Gopher-style rule ENSEMBLE: each document scored by how many of
    five independent quality rules it passes (length floor, stopword
    floor, punctuation ceiling, mean-token-length band, char floor),
    keep = score >= 4 — the explainable composite gate a curation
    pipeline tunes rule-by-rule (each rule's pass bit is emitted, so a
    failing cohort is attributable). One stateless vectorized pass over
    `quality_batch`'s 6-dp-rounded features; comparisons run on the
    same rounded values as the SQL replay, so the gate cannot flip."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        q = tx.quality_batch(t)
        b = [
            pc.greater_equal(q["n_tokens"], pa.scalar(20, pa.int64())),
            pc.greater_equal(q["stop_ratio"], pa.scalar(0.02)),
            pc.less_equal(q["punct_ratio"], pa.scalar(0.2)),
            pc.and_(
                pc.greater_equal(q["mean_tok_len"], pa.scalar(3.0)),
                pc.less_equal(q["mean_tok_len"], pa.scalar(12.0)),
            ),
            pc.greater_equal(q["n_chars"], pa.scalar(100, pa.int64())),
        ]
        ints = [pc.cast(x, pa.int64()) for x in b]
        score = ints[0]
        for x in ints[1:]:
            score = pc.add(score, x)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "r_len": ints[0],
                "r_stop": ints[1],
                "r_punct": ints[2],
                "r_toklen": ints[3],
                "r_chars": ints[4],
                "score": score,
                "keep": pc.cast(
                    pc.greater_equal(score, pa.scalar(4, pa.int64())),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUALITY_COMPOSITE_SQL = f"""
with q as ({{QSCORE}})
select doc_id,
       (n_tokens >= 20)::bigint as r_len,
       (stop_ratio >= 0.02)::bigint as r_stop,
       (punct_ratio <= 0.2)::bigint as r_punct,
       (mean_tok_len >= 3.0 and mean_tok_len <= 12.0)::bigint
         as r_toklen,
       (n_chars >= 100)::bigint as r_chars,
       ((n_tokens >= 20)::bigint + (stop_ratio >= 0.02)::bigint
        + (punct_ratio <= 0.2)::bigint
        + (mean_tok_len >= 3.0 and mean_tok_len <= 12.0)::bigint
        + (n_chars >= 100)::bigint) as score,
       (((n_tokens >= 20)::bigint + (stop_ratio >= 0.02)::bigint
        + (punct_ratio <= 0.2)::bigint
        + (mean_tok_len >= 3.0 and mean_tok_len <= 12.0)::bigint
        + (n_chars >= 100)::bigint) >= 4)::bigint as keep
from q
"""


POSTINGS_CAP = 64  # terms with df above this carry no postings list


def q_build_postings(sf_dir: str):
    """Inverted-index build (the search-engine construction step):
    term -> (df, sorted postings list). Two phases: (1) exact document
    frequency per term via the salted Arrow C++ grouped count; (2)
    postings lists materialize ONLY for terms with df <= POSTINGS_CAP
    — the rare/discriminative tail a phrase lookup actually probes.
    High-df terms (the stopword class) keep their df but an empty
    postings string: their lists are corpus-sized, and a real index
    stores them as bitmap/skip structures, never row explosions — the
    cap is the skew guard (same stance as LINE_DROP_CAP), and the
    dropped volume is exactly the df > cap rows, visible in the
    output. Per-term groups in phase 2 are bounded by the cap, so the
    map_groups is safe at 10^12 docs; shuffles are keyed by term."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        d_out: list[int] = []
        t_out: list[str] = []
        for did, s in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            seen = set()
            for w in (s or "").split(" "):
                if w and w not in seen:
                    seen.add(w)
                    d_out.append(did)
                    t_out.append(w)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "term": pa.array(t_out, pa.string()),
            }
        )

    pairs = docs.map_batches(explode, batch_format="pyarrow")
    df = _grouped_count(pairs, "term", "df").materialize()
    nparts = dd.adaptive_partitions(_table_rows(sf_dir, "documents") * 60)
    # join against the FULL df table (the tfidf-proven join shape),
    # filter to the under-cap tail AFTER: a pre-filtered right side can
    # be near-empty on dense corpora, and ray 2.49's hash-shuffle join
    # intermittently loses the schema of all-empty right partitions
    under = sj.safe_join(
        pairs, df, join_type="inner", num_partitions=nparts, on=("term",),
    ).filter(expr=f"df <= {POSTINGS_CAP}")

    def plist(g: pa.Table) -> pa.Table:
        ids = sorted(g["doc_id"].to_pylist())
        return pa.table(
            {
                "term": g["term"].slice(0, 1),
                "df": g["df"].slice(0, 1),
                "postings": pa.array(
                    [",".join(str(i) for i in ids)], pa.string()
                ),
            }
        )

    post = under.groupby("term").map_groups(
        plist, batch_format="pyarrow"
    )
    over = df.filter(expr=f"df > {POSTINGS_CAP}").map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "df": t["df"],
                "postings": pa.array([""] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return post.union(over)


BUILD_POSTINGS_SQL = f"""
with pairs as (
  select distinct doc_id, term from (
    select doc_id, unnest(string_split(text, ' ')) as term
    from documents)
  where term <> ''),
d as (select term, count(*)::bigint as df from pairs group by term)
select p.term, d.df,
       case when d.df <= {POSTINGS_CAP}
            then string_agg(p.doc_id::varchar, ','
                            order by p.doc_id)
            else '' end as postings
from pairs p join d using (term)
group by p.term, d.df
"""


LINKDENS_BOILER_PPM = 500_000  # anchor-majority pages are boilerplate


def q_link_density(sf_dir: str):
    """Per-page link-density — the core boilerplate heuristic of the
    main-content stripper (`sources/htmlio.py`'s text-density/
    link-density pass, reference src/data.py's HTML path) exposed as a
    value-verified table: content chars (inside <p> blocks), anchor
    chars (inside <a> text), and density_ppm = anchor/(content+anchor)
    in integer ppm; pages past LINKDENS_BOILER_PPM are flagged
    boilerplate (nav/listing pages, the crawl's non-content mass). One
    stateless compiled-regex pass over the html binary column, no
    shuffle — read-bound at 10^12 pages."""
    pages = rd.read_parquet(link_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        cc: list[int] = []
        ac: list[int] = []
        for h in t["html"].to_pylist():
            s = h.decode("utf-8")
            cc.append(sum(len(m) for m in HTML_P_RE.findall(s)))
            ac.append(
                sum(len(m[1]) for m in LINK_ANCHOR_RE.findall(s))
            )
        dens = [
            (a * 1_000_000) // (c + a) if (c + a) else 0
            for c, a in zip(cc, ac)
        ]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "content_chars": pa.array(cc, pa.int64()),
                "anchor_chars": pa.array(ac, pa.int64()),
                "link_density_ppm": pa.array(dens, pa.int64()),
                "is_boilerplate": pa.array(
                    [int(d >= LINKDENS_BOILER_PPM) for d in dens],
                    pa.int64(),
                ),
            }
        )

    return pages.map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


HTML_P_RE = re.compile(r"<p>([^<]*)</p>")




def q_join_outer(sf_dir: str):
    """Distributed FULL OUTER join of two aggregated fact sides —
    per-user event counts ⟗ per-customer order totals — expressed
    without an outer-join primitive: each side pre-aggregates to one row
    per key (combiner shape, so the shuffle carries keys not facts),
    tags itself with ZERO-filled measure columns for the other side, and
    a single groupby(key) Sum re-combines them; a key present on one
    side only keeps that side's measures and zeros elsewhere, which IS
    the outer semantics (COALESCE(x, 0) on both engine and oracle keeps
    the value-hash null-free). Three int-keyed shuffles total, all on
    pre-aggregated rows — the 100 TB plan for outer-joining two fact
    tables whose key universes only partially overlap."""
    ev = _read(sf_dir, "events", ["user_id"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def ev_partial(t: pa.Table) -> pa.Table:
        part = t.group_by("user_id").aggregate([([], "count_all")])
        part = part.rename_columns(["key", "n_events"])
        z = pa.nulls(len(part), pa.int64()).fill_null(0)
        return pa.table(
            {
                "key": pc.cast(part["key"], pa.int64()),
                "n_events": pc.cast(part["n_events"], pa.int64()),
                "n_orders": z,
                "total_price": pc.cast(z, pa.float64()),
            }
        )

    def od_partial(t: pa.Table) -> pa.Table:
        part = t.group_by("o_custkey").aggregate(
            [("o_totalprice", "count"), ("o_totalprice", "sum")]
        )
        part = part.rename_columns(["key", "n_orders", "total_price"])
        z = pa.nulls(len(part), pa.int64()).fill_null(0)
        return pa.table(
            {
                "key": pc.cast(part["key"], pa.int64()),
                "n_events": z,
                "n_orders": pc.cast(part["n_orders"], pa.int64()),
                "total_price": pc.cast(part["total_price"], pa.float64()),
            }
        )

    both = ev.map_batches(
        ev_partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        od.map_batches(od_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    agg = both.groupby("key").aggregate(
        ray.data.aggregate.Sum("n_events", alias_name="n_events"),
        ray.data.aggregate.Sum("n_orders", alias_name="n_orders"),
        ray.data.aggregate.Sum("total_price", alias_name="total_price"),
    )

    def finish(t: pa.Table) -> pa.Table:
        ne = pc.cast(t["n_events"], pa.int64())
        no = pc.cast(t["n_orders"], pa.int64())
        side = pc.if_else(
            pc.and_(pc.greater(ne, 0), pc.greater(no, 0)),
            pa.scalar("both"),
            pc.if_else(
                pc.greater(ne, 0),
                pa.scalar("events_only"),
                pa.scalar("orders_only"),
            ),
        )
        return pa.table(
            {
                "key": pc.cast(t["key"], pa.int64()),
                "n_events": ne,
                "n_orders": no,
                "total_price": pc.round(t["total_price"], 2),
                "side": side,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
