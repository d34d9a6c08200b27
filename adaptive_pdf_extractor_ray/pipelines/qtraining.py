"""Training-set assembly: hash splits, BM25, embeddings packing, crawl frontier.

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
from .qquality import (  # noqa: F401
    LINK_N,
)
from .qgraph import (  # noqa: F401
    _outlinks_ds, link_corpus,
)
from .qcuration import (  # noqa: F401
    SPLIT_BUCKETS, SPLIT_TRAIN,
)

SPLIT_VALID = 90  # buckets [80,90) -> valid; rest -> test


def q_split_assign(sf_dir: str):
    """Deterministic train/valid/test assignment (the reproducible-split
    requirement of any training-data build): bucket = md5(doc_id) mod 100
    — a pure per-row map, no shuffle, no RNG state, stable across
    re-partitioning and resume. Same md5-prefix-as-integer convention as
    the KMV sketch / stratified sampler so one hashing idiom serves the
    whole repo."""
    import hashlib as _hl

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        buckets = [
            int(_hl.md5(str(i).encode()).hexdigest()[:15], 16) % SPLIT_BUCKETS
            for i in ids
        ]
        splits = [
            "train" if b < SPLIT_TRAIN else "valid" if b < SPLIT_VALID
            else "test"
            for b in buckets
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(splits, pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


SPLIT_ASSIGN_SQL = f"""
with b as (
  select doc_id,
         (('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::ubigint
          % {SPLIT_BUCKETS})::bigint as bucket
  from documents)
select doc_id, bucket,
       case when bucket < {SPLIT_TRAIN} then 'train'
            when bucket < {SPLIT_VALID} then 'valid'
            else 'test' end as split
from b
"""


BM25_TERMS = ["hash", "join", "stream"]  # the fixed search query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def q_bm25_search(sf_dir: str):
    """BM25 ranked retrieval of the top-K documents for a fixed query
    termset (the classic quality-retrieval / seed-selection primitive).
    One tokenizing pass emits a NARROW per-doc stats row (doc_id, dl,
    tf per query term) — the corpus text never moves again; N comes from
    parquet metadata, avgdl and per-term document frequencies from ONE
    tiny ``aggregate`` over the stats, and scoring is a vectorized
    numpy map with the idf/avgdl scalars closed over (they are plain
    floats — restart-safe, no object-store refs). Top-K via the
    per-block-partial + single final reduce of ``dataset_topk`` — the
    network moves O(K x blocks) rows, never a global sort. Term addition
    order is fixed (BM25_TERMS order) and scores are rounded to 6 dp
    before ranking so ties resolve identically in both engines."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _table_rows(sf_dir, "documents")
    terms = list(BM25_TERMS)

    def stats(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {"doc_id": t["doc_id"].to_pylist()}
        dls: list[int] = []
        tfs: list[list[int]] = [[] for _ in terms]
        for txt in t["text"].to_pylist():
            ws = [w for w in (txt or "").split(" ") if w]
            dls.append(len(ws))
            for i, term in enumerate(terms):
                tfs[i].append(sum(1 for w in ws if w == term))
        cols["dl"] = dls
        for i in range(len(terms)):
            cols[f"tf{i}"] = tfs[i]
        return pa.table(
            {
                "doc_id": pa.array(cols["doc_id"], pa.int64()),
                "dl": pa.array(cols["dl"], pa.int64()),
                **{
                    f"tf{i}": pa.array(cols[f"tf{i}"], pa.int64())
                    for i in range(len(terms))
                },
            }
        )

    st = docs.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # narrow (doc_id, dl, tf*) rows; reused twice below

    def df_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sum_dl": pa.array([int(pc.sum(t["dl"]).as_py() or 0)]),
                **{
                    f"df{i}": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.cast(
                                        pc.greater(t[f"tf{i}"], 0), pa.int64()
                                    )
                                ).as_py()
                                or 0
                            )
                        ]
                    )
                    for i in range(len(terms))
                },
            }
        )

    parts = st.map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one row per block — tiny
    sum_dl = sum(p["sum_dl"] for p in parts)
    avgdl = float(sum_dl) / float(n_docs)
    idf = [
        math.log(
            (float(n_docs) - sum(p[f"df{i}"] for p in parts) + 0.5)
            / (sum(p[f"df{i}"] for p in parts) + 0.5)
            + 1.0
        )
        for i in range(len(terms))
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = np.asarray(t["dl"].to_pylist(), dtype=np.float64)
        denom_norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        s = np.zeros(len(dl), dtype=np.float64)
        for i in range(len(terms)):
            tf = np.asarray(t[f"tf{i}"].to_pylist(), dtype=np.float64)
            s = s + idf[i] * tf * (BM25_K1 + 1.0) / (tf + denom_norm)
        s = np.round(s, 6)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "score": pa.array(s, pa.float64()),
            }
        )
        return out.filter(pc.greater(out["score"], 0.0))

    from ..stages.topk import dataset_topk

    scored = st.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return dataset_topk(
        scored,
        sort_keys=[("score", "descending"), ("doc_id", "ascending")],
        k=BM25_TOPK,
    )


OUTLIER_Z = 2.0  # |z| above this flags an embedding outlier


def q_embedding_outliers(sf_dir: str):
    """Embedding-space outlier scoring (the off-distribution filter of
    an embedding-curated corpus): distance of every vector to the GLOBAL
    centroid, z-scored against the corpus distance distribution. Shape:
    per-batch partial (vector-sum, count) rows -> driver combine (one
    row per block — tiny at any scale) -> broadcast centroid -> one
    distance pass whose (dist, dist^2) partials yield mean/std the same
    way -> final stateless map. The corpus is read twice but shuffled
    never; all reductions move O(blocks) rows. All arithmetic in float64
    with the same formulas as the oracle (sigma via the
    sum-of-squares identity, not a streaming estimator)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = _table_rows(sf_dir, "embeddings")

    def centroid_partial(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "vsum": pa.array([X.sum(axis=0).tolist()],
                                 pa.list_(pa.float64())),
            }
        )

    parts = emb.map_batches(
        centroid_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    centroid = np.sum(
        [np.asarray(p["vsum"], dtype=np.float64) for p in parts], axis=0
    ) / float(n)

    def dist_batch(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        d = np.sqrt(((X - centroid) ** 2).sum(axis=1))
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "dist": pa.array(d, pa.float64()),
            }
        )

    dists = emb.map_batches(
        dist_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # narrow (vec_id, dist) — reused for stats + output

    def mom_partial(t: pa.Table) -> pa.Table:
        d = np.asarray(t["dist"].to_pylist(), dtype=np.float64)
        return pa.table(
            {"s1": pa.array([float(d.sum())]),
             "s2": pa.array([float((d * d).sum())])}
        )

    mom = dists.map_batches(
        mom_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    mu = sum(p["s1"] for p in mom) / float(n)
    sigma = math.sqrt(sum(p["s2"] for p in mom) / float(n) - mu * mu)

    def finish(t: pa.Table) -> pa.Table:
        d = np.asarray(t["dist"].to_pylist(), dtype=np.float64)
        z = (d - mu) / sigma
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "dist": pa.array(np.round(d, 6), pa.float64()),
                "z": pa.array(np.round(z, 6), pa.float64()),
                "is_outlier": pa.array(z > OUTLIER_Z, pa.bool_()),
            }
        )

    return dists.map_batches(finish, batch_format="pyarrow")


EMBEDDING_OUTLIERS_SQL = f"""
with u as (
  select vec_id, generate_subscripts(embedding, 1) as pos,
         unnest(embedding)::double as v
  from embeddings),
n as (select count(*)::double as n from embeddings),
c as (select pos, sum(v) / (select n from n) as cv from u group by pos),
d as (
  select vec_id, sqrt(sum((v - cv) * (v - cv))) as dist
  from u join c using (pos) group by vec_id),
s as (select sum(dist) / (select n from n) as mu,
             sqrt(sum(dist * dist) / (select n from n)
                  - (sum(dist) / (select n from n))
                    * (sum(dist) / (select n from n))) as sigma
      from d)
select vec_id, round(dist, 6) as dist,
       round((dist - mu) / sigma, 6) as z,
       ((dist - mu) / sigma > {OUTLIER_Z}) as is_outlier
from d, s
"""


DSIR_BUCKETS = 8192  # hashed-unigram feature space (DSIR-style)
DSIR_TARGET_LANG = "en"  # the 'target domain' whose distribution we match


def q_dsir_weights(sf_dir: str):
    """DSIR-style importance weights (data selection for language
    models via importance resampling, Xie et al. 2023): features are
    md5-hashed unigram buckets; two bag-of-words unigram models — the
    TARGET (docs whose lang is the target) and the RAW corpus — are fit
    in ONE combined counting pass (per-batch (bucket, n_all, n_tgt)
    partials -> a bounded groupby of <= DSIR_BUCKETS rows), and each
    doc's weight is the sum over its tokens of the add-1-smoothed
    log-likelihood ratio. The bucket->logratio table is a plain dict in
    the scoring map's closure (<= 8192 floats — restart-safe broadcast).
    Bucket counts are integers, so both engines compute bit-identical
    log arguments; only the per-doc float sum order differs — absorbed
    by the 6-dp round like every float aggregate here."""
    import hashlib as _hl

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def _bucket(w: str) -> int:
        return int(_hl.md5(w.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS

    def count_partials(t: pa.Table) -> pa.Table:
        agg: dict[int, list[int]] = {}
        for txt, lang in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
            is_tgt = lang == DSIR_TARGET_LANG
            for w in (txt or "").split(" "):
                if not w:
                    continue
                c = agg.setdefault(_bucket(w), [0, 0])
                c[0] += 1
                if is_tgt:
                    c[1] += 1
        return pa.table(
            {
                "bucket": pa.array(list(agg.keys()), pa.int64()),
                "n_all": pa.array([v[0] for v in agg.values()], pa.int64()),
                "n_tgt": pa.array([v[1] for v in agg.values()], pa.int64()),
            }
        )

    counts = (
        docs.map_batches(
            count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .sum(["n_all", "n_tgt"])
        .take_all()  # <= DSIR_BUCKETS rows by construction
    )
    t_all = float(sum(r["sum(n_all)"] for r in counts))
    t_tgt = float(sum(r["sum(n_tgt)"] for r in counts))
    logratio = {
        r["bucket"]: math.log(
            (r["sum(n_tgt)"] + 1.0) / (t_tgt + DSIR_BUCKETS)
        )
        - math.log((r["sum(n_all)"] + 1.0) / (t_all + DSIR_BUCKETS))
        for r in counts
    }

    def score(t: pa.Table) -> pa.Table:
        ids_out, nt_out, w_out = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = [w for w in (txt or "").split(" ") if w]
            if not ws:
                continue
            s = math.fsum(logratio[_bucket(w)] for w in ws)
            ids_out.append(did)
            nt_out.append(len(ws))
            w_out.append(round(s, 6))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_tokens": pa.array(nt_out, pa.int64()),
                "dsir_logratio": pa.array(w_out, pa.float64()),
            }
        )

    return docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


DSIR_WEIGHTS_SQL = f"""
with tok as (
  select doc_id, lang, w
  from (select doc_id, lang, unnest(string_split(text, ' ')) as w
        from documents)
  where w <> ''),
b as (
  select doc_id,
         (('0x' || substr(md5(w), 1, 15))::ubigint
          % {DSIR_BUCKETS})::bigint as bucket,
         lang
  from tok),
cnt as (
  select bucket, count(*)::double as n_all,
         sum(case when lang = '{DSIR_TARGET_LANG}' then 1 else 0
             end)::double as n_tgt
  from b group by bucket),
tot as (select sum(n_all) as t_all, sum(n_tgt) as t_tgt from cnt),
lw as (
  select bucket,
         ln((n_tgt + 1.0) / (t_tgt + {DSIR_BUCKETS}))
         - ln((n_all + 1.0) / (t_all + {DSIR_BUCKETS})) as w
  from cnt, tot)
select doc_id, count(*)::bigint as n_tokens,
       round(sum(w), 6) as dsir_logratio
from b join lw using (bucket)
group by doc_id
"""


def q_crawl_frontier(sf_dir: str):
    """Politeness-scheduled crawl frontier: outlink targets that are NOT
    already crawled, each assigned a per-host fetch slot (row_number
    within host, ordered by url) and a fetch offset of slot x
    CRAWL_DELAY_S — the work plan a distributed fetcher consumes.
    Plan: edge extraction (no shuffle) -> groupby(dst) ref-count (the
    frontier dedup — moves (url, partial count) rows) -> LEFT ANTI join
    against the crawled url set (hash join keyed by url; the crawled
    side is whatever the crawl ledger is, never broadcast) -> ONE
    groupby(host) enumeration. The per-host group holds that host's
    frontier only; for a pathological host owning ~10^8 frontier urls,
    the bounded-group decomposition of q_global_rank (bucket by url
    range, driver-cumsum the bucket bases) applies unchanged — the
    politeness ORDER is per-host, so the decomposition is exact.

    The link fixture's graph is closed (every target is a page), so the
    LEDGER here marks pages with page-number % 4 == 3 as not yet
    fetched — a deterministic quarter of the corpus forms the frontier,
    and the anti-join is exercised with a non-trivial survivor set on
    both engines."""
    pages_dir = link_corpus()
    edges = _outlinks_ds(pages_dir)

    def ref_partials(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for d in t["dst"].to_pylist():
            agg[d] = agg.get(d, 0) + 1
        return pa.table(
            {
                "url": pa.array(list(agg.keys()), pa.string()),
                "n_refs": pa.array(list(agg.values()), pa.int64()),
            }
        )

    frontier = (
        edges.map_batches(
            ref_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("url")
        .sum("n_refs")
    )
    def ledger(t: pa.Table) -> pa.Table:
        mask = [
            int(u.rsplit("p", 1)[1]) % 4 != 3 for u in t["url"].to_pylist()
        ]
        return t.filter(pa.array(mask, pa.bool_()))

    crawled = rd.read_parquet(pages_dir, columns=["url"]).map_batches(
        ledger, batch_format="pyarrow", zero_copy_batch=True
    )
    new = sj.safe_join(
        frontier, crawled,
        join_type="left_anti",
        on=("url",),
        num_partitions=dd.adaptive_partitions(LINK_N),
    )

    def add_host(t: pa.Table) -> pa.Table:
        hosts = [
            (u.split("://", 1)[1] if "://" in u else "").split("/", 1)[0]
            for u in t["url"].to_pylist()
        ]
        return pa.table(
            {
                "url": t["url"],
                "host": pa.array(hosts, pa.string()),
                "n_refs": t["sum(n_refs)"],
            }
        )

    def schedule(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g["url"]))
        slots = np.arange(g.num_rows, dtype=np.int64)
        return pa.table(
            {
                "url": g["url"],
                "host": g["host"],
                "n_refs": g["n_refs"],
                "slot": pa.array(slots, pa.int64()),
                "offset_s": pa.array(slots * CRAWL_DELAY_S, pa.int64()),
            }
        )

    return (
        new.map_batches(add_host, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .map_groups(schedule, batch_format="pyarrow")
    )


LANG_TOPK = 10  # terms kept per language


def q_top_terms_by_lang(sf_dir: str):
    """Grouped top-K: the K most frequent words PER LANGUAGE (the
    per-subcorpus vocabulary report of a multilingual build). Counting
    is the usual combiner (per-batch (lang, word, n) partials -> one
    groupby(lang, word) sum); ranking never sorts globally — a
    per-block prune keeps at most K rows per lang (global per-lang
    top-K is a subset of the union of per-block per-lang top-Ks), so
    the final groupby(lang) reduces O(K x blocks) rows per language,
    independent of vocabulary size. Ties break by word ascending in
    both engines."""
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def partials(t: pa.Table) -> pa.Table:
        agg: dict[tuple[str, str], int] = {}
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in (txt or "").split(" "):
                if w:
                    k = (lang, w)
                    agg[k] = agg.get(k, 0) + 1
        return pa.table(
            {
                "lang": pa.array([k[0] for k in agg], pa.string()),
                "word": pa.array([k[1] for k in agg], pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["lang", "word"])
        .sum("n")
    )
    keys = [
        ("lang", "ascending"),
        ("sum(n)", "descending"),
        ("word", "ascending"),
    ]

    def prune(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        langs = t["lang"].to_pylist()
        keep, seen = [], {}
        for i, lang in enumerate(langs):
            c = seen.get(lang, 0)
            if c < LANG_TOPK:
                keep.append(i)
                seen[lang] = c + 1
        return t.take(pa.array(keep, pa.int64()))

    def final(g: pa.Table) -> pa.Table:
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("sum(n)", "descending"), ("word", "ascending")],
            )
        ).slice(0, LANG_TOPK)
        return pa.table(
            {
                "lang": g["lang"],
                "word": g["word"],
                "n": g["sum(n)"],
                "rank": pa.array(range(1, g.num_rows + 1), pa.int64()),
            }
        )

    return (
        counts.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(final, batch_format="pyarrow")
    )


TOP_TERMS_BY_LANG_SQL = f"""
with tok as (
  select lang, w
  from (select lang, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
cnt as (select lang, w as word, count(*)::bigint as n
        from tok group by lang, w)
select lang, word, n, rank from (
  select lang, word, n,
         row_number() over (
           partition by lang order by n desc, word) as rank
  from cnt)
where rank <= {LANG_TOPK}
"""




def warc_corpus() -> tuple[str, str]:
    """Lazily write the deterministic WARC fixture (real ISO-28500 bytes
    + an independent ground-truth parquet); idempotent, shared by the
    Ray query and the oracle composer."""
    import tempfile

    from ..sources.warc import write_warc_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_warc_240")
    return write_warc_corpus(root, n=240, shards=4)
