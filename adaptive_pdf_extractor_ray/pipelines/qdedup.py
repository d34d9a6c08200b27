"""Dedup family: exact/URL/line/CDC/Bloom/minhash/LSH/setsim/simhash chains and their audits.

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
    BROADCAST_MAX_ROWS, EDITDIST_CAP, _apool, _lev_bytes,
    _pq, _read, _table_rows, adaptive_partitions_docs,
)





def q_cdc_dedup(sf_dir: str):
    """Content-defined-chunking dedup (the rsync/LBFS trick applied to
    corpus curation): docs split at rolling-hash breakpoints
    (``stages/text.py:cdc_chunk_batch``), chunks keyed by content md5,
    and every doc reports how much of it — by chunk count and by byte
    volume — is duplicated SOMEWHERE else in the corpus. Unlike
    line_dedup (fixed line boundaries) or dedup_substring (fixed-stride
    shingles), CDC boundaries move WITH the content: prepend a byline to
    a syndicated article and the downstream chunks re-align and still
    match. Dataflow: chunk explode (combiner — shuffles (doc_id, ck,
    clen), never text) → per-chunk distinct-doc count via two bounded
    groupbys → one hash join back on ck → per-doc fold. All stages are
    key-partitioned; no driver materialization, no O(corpus) state."""
    chunks = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.cdc_chunk_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    freq = (
        chunks.select_columns(["ck", "doc_id"])
        .groupby(["ck", "doc_id"])
        .count()
        .groupby("ck")
        .count()
    ).map_batches(
        lambda t: pa.table({"ck": t["ck"], "nd": t["count()"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = sj.safe_join(
        chunks, freq, join_type="inner", on=("ck",),
        num_partitions=adaptive_partitions_docs(sf_dir),
    )

    def flags(t: pa.Table) -> pa.Table:
        dup = pc.greater_equal(t["nd"], pa.scalar(2))
        clen = t["clen"]
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "dup": pc.cast(dup, pa.int64()),
                "dupb": pc.if_else(dup, clen, zero),
                "clen": clen,
            }
        )

    agg = (
        j.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_chunks"),
            ray.data.aggregate.Sum("dup", alias_name="n_dup_chunks"),
            ray.data.aggregate.Sum("dupb", alias_name="dupb"),
            ray.data.aggregate.Sum("clen", alias_name="nb"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        # integer byte tallies, not a rounded ratio: chunk-length ratios
        # land on exact binary halves (1/128 = 0.0078125) where numpy
        # half-to-even and SQL half-away-from-zero disagree at any fixed
        # precision — the integers are hash-exact and the frac derivable
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chunks": pc.cast(t["n_chunks"], pa.int64()),
                "n_dup_chunks": pc.cast(t["n_dup_chunks"], pa.int64()),
                "dup_bytes": pc.cast(t["dupb"], pa.int64()),
                "total_bytes": pc.cast(t["nb"], pa.int64()),
            }
        )

    return agg.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partitioned keep-first (min doc_id) per content."""
    hashed = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.content_hash_batch, batch_format="pyarrow"
    )
    agg = hashed.groupby("content_md5").aggregate(
        ray.data.aggregate.Min("doc_id", alias_name="keep_doc_id"),
        ray.data.aggregate.Count(alias_name="n_copies"),
    )
    return agg


def _lsh_candidate_pairs(sf_dir: str, docs: rd.Dataset | None = None):
    """shingle -> md5 minhash -> band groupby -> candidate pairs (the LSH
    core, fully SQL-reproducible). ``docs`` overrides the default
    documents read (e.g. the dedup_eval sample)."""
    if docs is None:
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = docs.map_batches(
        dd.MinHasher, batch_format="pyarrow", concurrency=_apool(),
    )
    bands = sigs.map_batches(dd.explode_bands, batch_format="pyarrow")
    # default max_bucket: all-pairs while a bucket is small (exact LSH,
    # what the oracle replicates); giant skewed buckets (boilerplate /
    # empty pages) take the bounded star+adjacency path in bucket_pairs
    return bands.groupby(["band_id", "band_hash"]).map_groups(
        dd.bucket_pairs, batch_format="pyarrow",
    )


def _lsh_distinct_pairs(sf_dir: str) -> rd.Dataset:
    """Distinct candidate pairs as a Dataset (the same pair surfaces from
    up to LSH_BANDS bands): distributed dedup, never a driver set.

    Implemented as salt-partition + per-partition Arrow ``group_by``
    instead of ``Dataset.groupby(a, b).aggregate(Count)``: the engine's
    hash aggregate combines rows at Python speed (~15 µs/row — it
    dominated the whole LSH chain at 100k docs, 270 s remote CPU for
    ~18M raw pair rows), while the salt key shuffles the same rows once
    and the per-partition distinct runs in Arrow's C++ hash table. The
    salt is a deterministic mix of (a, b), so every duplicate lands in
    the same partition — the dedup is exact."""
    return _distinct_pairs(_lsh_candidate_pairs(sf_dir))


def _grouped_count(ds: rd.Dataset, key: str, out: str) -> rd.Dataset:
    """groupby(key).count() via salted partitions + per-partition Arrow
    C++ ``group_by`` — ``Dataset.groupby().aggregate(Count)`` combines
    rows at Python speed and dominated the TF-IDF chain at 100k docs
    (133 s remote CPU for the df rowcount). The salt is a deterministic
    crc32 of the key (NOT Python ``hash``, which is per-process salted
    and would scatter a key across partitions), so the count is exact."""
    import zlib

    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(8, n_cpu * 2)

    def salt(t: pa.Table) -> pa.Table:
        p = [zlib.crc32(v.encode("utf-8")) % n_parts
             for v in t[key].to_pylist()]
        return t.append_column("p", pa.array(p, pa.int64()))

    def cnt(g: pa.Table) -> pa.Table:
        r = g.select([key]).group_by(key).aggregate([([], "count_all")])
        return r.rename_columns([key, out])

    return (
        ds.map_batches(salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .map_groups(cnt, batch_format="pyarrow")
    )


def _distinct_pairs(pairs: rd.Dataset) -> rd.Dataset:
    """Exact distinct over an (a, b) pair Dataset: salt-partition shuffle
    + per-partition Arrow C++ ``group_by`` (see _lsh_distinct_pairs)."""
    n_cpu = int(ray.cluster_resources().get("CPU", 4))
    n_parts = max(8, n_cpu * 2)

    def add_salt(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            mix = a * np.uint64(0x9E3779B97F4A7C15) ^ b
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "p": pa.array((mix % np.uint64(n_parts)).astype(np.int64)),
            }
        )

    def dedup_part(g: pa.Table) -> pa.Table:
        return g.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    return (
        pairs
        .map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .map_groups(dedup_part, batch_format="pyarrow")
    )


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH candidate pairs — value-verified against a pure-SQL
    re-implementation of the whole minhash (md5 hashing, mod-2^64
    permutations, banding)."""
    return _lsh_distinct_pairs(sf_dir)


def q_dedup_minhash_clusters(sf_dir: str):
    """Near-dup clusters: LSH candidates -> distributed text join ->
    Jaccard >= 0.5 verify in map_batches -> min-label-propagation
    connected components. Every step is a Dataset op (joins, groupbys);
    nothing driver-side scales with the corpus or the pair set. The
    oracle reproduces the whole chain in SQL, components via a recursive
    CTE."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _lsh_distinct_pairs(sf_dir)
    with_texts = dd.attach_pair_texts(pairs, docs)
    verified = with_texts.map_batches(
        dd.jaccard_pairs_batch, batch_format="pyarrow"
    ).filter(expr="jaccard >= 0.5").select_columns(["a", "b"])
    return dd.connected_components(verified)


def q_dedup_keep_best(sf_dir: str):
    """Cluster-aware dedup curation: LSH candidates -> Jaccard verify ->
    connected components -> keep ONE survivor per near-dup cluster (the
    member with the most tokens; ties -> min doc_id). The end-to-end
    near-dup dedup step of a pretraining pipeline, fully distributed
    (joins + groupbys), value-verified via recursive-CTE + window SQL."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _lsh_distinct_pairs(sf_dir)
    verified = dd.attach_pair_texts(pairs, docs).map_batches(
        dd.jaccard_pairs_batch, batch_format="pyarrow"
    ).filter(expr="jaccard >= 0.5").select_columns(["a", "b"])
    cc = dd.connected_components(verified).materialize()
    qual = docs.map_batches(tx.token_count_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    j = sj.safe_join(
        cc, qual, join_type="inner",
        num_partitions=dd.adaptive_partitions(cc.count()),
        on=("doc_id",),
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("rep_id", pa.int64())]
        ),
    )

    def pick(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("n_tokens", "descending"), ("doc_id", "ascending")]
        )
        first = g.take(idx.slice(0, 1))
        return pa.table(
            {
                "rep_id": first["rep_id"],
                "keep_doc_id": first["doc_id"],
                "n_members": pa.array([g.num_rows], pa.int64()),
                "best_n_tokens": first["n_tokens"],
            }
        )

    return j.groupby("rep_id").map_groups(pick, batch_format="pyarrow")


TFIDF_K = 3


def q_tfidf_top_terms(sf_dir: str):
    """Per-doc TF-IDF top-3 terms: per-batch (doc, term, tf) partials ->
    df via groupby(term) rowcount -> hash join tf⋈df on term -> vectorized
    scoring -> per-doc top-K (sorted on the ROUNDED score so the SQL
    oracle's selection matches bit-for-bit)."""
    import math

    import pyarrow.parquet as pq_

    n_docs = pq_.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        d_out: list[int] = []
        t_out: list[str] = []
        c_out: list[int] = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in (s or "").split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
            for w, c in counts.items():
                d_out.append(did)
                t_out.append(w)
                c_out.append(c)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "term": pa.array(t_out, pa.string()),
                "tf": pa.array(c_out, pa.int64()),
            }
        )

    tfs = docs.map_batches(explode, batch_format="pyarrow")
    df = _grouped_count(tfs, "term", "df").materialize()
    if df.count() <= BROADCAST_MAX_ROWS:
        # the df side is the DISTINCT vocabulary — orders of magnitude
        # smaller than the tf rows. Broadcasting it as a dict lets ONE
        # fused stage over the documents table tokenize, score and take
        # the per-doc top-K in place, emitting K rows per doc — replacing
        # a shuffle of EVERY tf row for the join (57 s remote CPU at 100k
        # docs) plus a second 30M-row shuffle for the per-doc groupby.
        # The hash-join path below stays the route for vocabularies past
        # the broadcast budget (raw web token space can reach hundreds of
        # millions).
        lookup: dict[str, int] = {}
        for b in df.iter_batches(batch_format="pyarrow"):
            lookup.update(zip(b["term"].to_pylist(), b["df"].to_pylist()))
        dref = ray.put(lookup)
        log_n = float(n_docs)

        def fused_topk(t: pa.Table) -> pa.Table:
            m = ray.get(dref)
            d_out: list[int] = []
            t_out: list[str] = []
            s_out: list[float] = []
            for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                counts: dict[str, int] = {}
                for w in (s or "").split(" "):
                    if w:
                        counts[w] = counts.get(w, 0) + 1
                if not counts:
                    continue
                scored = sorted(
                    ((round(c * np.log(log_n / m[w]), 6), w)
                     for w, c in counts.items()),
                    key=lambda x: (-x[0], x[1]),
                )[:TFIDF_K]
                for sc, w in scored:
                    d_out.append(did)
                    t_out.append(w)
                    s_out.append(sc)
            return pa.table(
                {
                    "doc_id": pa.array(d_out, pa.int64()),
                    "term": pa.array(t_out, pa.string()),
                    "tfidf": pa.array(s_out, pa.float64()),
                }
            )

        return docs.map_batches(fused_topk, batch_format="pyarrow",
                                zero_copy_batch=True)
    joined = sj.safe_join(
        tfs, df, join_type="inner",
        num_partitions=dd.adaptive_partitions(
            _table_rows(sf_dir, "documents") * 32  # ~term rows per corpus
        ),
        on=("term",),
    )

    def score(t: pa.Table) -> pa.Table:
        tf = np.asarray(t["tf"].to_pylist(), dtype=np.float64)
        dfv = np.asarray(t["df"].to_pylist(), dtype=np.float64)
        s = np.round(tf * np.log(float(n_docs) / dfv), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tfidf": pa.array(s, pa.float64()),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("tfidf", "descending"), ("term", "ascending")]
        )
        return g.take(idx.slice(0, TFIDF_K))

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(topk, batch_format="pyarrow")
    )


def q_inverted_index(sf_dir: str):
    """Inverted-index build: distinct (term, doc_id) postings -> per-term
    sorted first-10 posting list (comma-joined) + doc frequency. The
    index-construction shape: one shuffle on term, list assembly inside
    the group."""
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

    def postings(g: pa.Table) -> pa.Table:
        ids = sorted(set(g["doc_id"].to_pylist()))
        return pa.table(
            {
                "term": pa.array([g["term"][0].as_py()], pa.string()),
                "df": pa.array([len(ids)], pa.int64()),
                "postings": pa.array(
                    [",".join(str(i) for i in ids[:10])], pa.string()
                ),
            }
        )

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .map_groups(postings, batch_format="pyarrow")
    )


def q_dedup_simhash(sf_dir: str):
    """SimHash signatures + 16-bit band keys (Hamming<=3 bucketing) —
    value-verified against a pure-SQL simhash."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        dd.simhash_batch, batch_format="pyarrow"
    )


def _jaccard_over_pairs(sf_dir: str, pairs):
    """Exact n-gram Jaccard verify over a GIVEN candidate-pair Dataset
    (shared by q_dedup_jaccard and q_minhash_calibration, which reuses
    one pair set for both estimate and exact streams)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dd.attach_pair_texts(pairs, docs).map_batches(
        dd.jaccard_pairs_batch, batch_format="pyarrow"
    )


def q_dedup_jaccard(sf_dir: str):
    """n-gram Jaccard over the LSH candidate-pair set: distributed text
    joins on doc_id (a then b) + per-batch verification — no driver-side
    text collection or pair materialization."""
    return _jaccard_over_pairs(sf_dir, _lsh_distinct_pairs(sf_dir))


def q_dedup_editdist(sf_dir: str):
    """Edit-similarity verification over the LSH candidate pairs — the
    character-level companion to the n-gram Jaccard verify (catches
    small in-place edits that shift every overlapping shingle: a
    one-token change kills k shingles but costs ~one edit). Same
    distributed shape (pair texts attach via the size-routed
    broadcast/joins, verification per batch, no driver materialization);
    the distance is byte-Levenshtein over the first EDITDIST_CAP (200)
    chars (vectorized numpy row-DP, DuckDB ``levenshtein`` semantics)
    and the similarity is integer ppm: (maxlen − d)·10⁶ // maxlen."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _lsh_distinct_pairs(sf_dir)

    def verify(t: pa.Table) -> pa.Table:
        dists, ppms = [], []
        for ta, tb in zip(t["text_a"].to_pylist(), t["text_b"].to_pylist()):
            xa = (ta or "")[:EDITDIST_CAP].encode("utf-8")
            xb = (tb or "")[:EDITDIST_CAP].encode("utf-8")
            d = _lev_bytes(xa, xb)
            m = max(len(xa), len(xb))
            dists.append(d)
            ppms.append((m - d) * 1_000_000 // m if m else 1_000_000)
        return pa.table(
            {
                "a": pc.cast(t["a"], pa.int64()),
                "b": pc.cast(t["b"], pa.int64()),
                "editdist": pa.array(dists, pa.int64()),
                "sim_ppm": pa.array(ppms, pa.int64()),
            }
        )

    return dd.attach_pair_texts(pairs, docs).map_batches(
        verify, batch_format="pyarrow"
    )


def q_dedup_containment(sf_dir: str):
    """Directional n-gram containment over the LSH candidate pairs —
    the asymmetric companion to ``dedup_ngram_jaccard``. A syndicated
    article embedded in a bigger host page scores high containment
    (article ⊆ page) but mediocre Jaccard (the host chrome inflates the
    union), so containment is the right kill signal for quote-expansion
    near-dups (Broder 1997). Same distributed shape: pair texts attach
    via two hash joins on doc_id, verification runs per batch — no
    driver-side text or pair materialization."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _lsh_distinct_pairs(sf_dir)
    return dd.attach_pair_texts(pairs, docs).map_batches(
        dd.containment_pairs_batch, batch_format="pyarrow"
    )


# setsim's broadcast budget for the shingle-df table (rows). Shares the
# rationale of BROADCAST_MAX_ROWS but is its own knob: shingle spaces
# grow ~linearly with corpus tokens, so real web corpora exceed it and
# take the distributed-join route.
SETSIM_BROADCAST_CAP = 5_000_000


def q_setsim_join(sf_dir: str, stats_out: dict | None = None):
    """EXACT set-similarity self-join (word-3-gram Jaccard >= tau) via
    df-ordered prefix filtering — the AllPairs/PPJoin family
    (`stages/setsim.py` for the theorem and the 10^12-doc partitioning
    notes). Unlike the MinHash-LSH chain this is deterministic and
    complete: the verified output EQUALS brute-force all-pairs, which is
    exactly what the relational oracle computes (pairs sharing >= 1
    shingle -> intersection counts via an exploded equijoin -> Jaccard
    filter) — the green hash check is a data-level proof of the prefix
    filter's no-false-negative guarantee. Completeness holds for every
    bucket under SETSIM_MAX_BUCKET; over-cap buckets (thousands of
    byte-identical copies) star-collapse by content_md5 with logged
    dropped volume (see stages/setsim.py — exact dedup is the upstream
    fix for such corpora).

    Dataflow: explode distinct shingles -> df count (salted Arrow C++
    groupby) -> per-doc prefix selection, SIZE-ROUTED like the repo's
    other lookups: a shingle vocabulary within SETSIM_BROADCAST_CAP
    ships the df table once via ray.put and ONE fused map over the docs
    sorts + slices each doc's prefix in place (no tok shuffle, no df
    join, no per-doc groupby — it halved the 100k-doc wall time); past
    the cap the exact distributed route takes over (join df back on
    shingle, prefix in bounded groupby(doc_id) groups — one doc's
    shingles, never corpus-sized), value-identical by equivalence test.
    Then candidate pairs from prefix-token buckets (skew-guarded) ->
    distinct pairs -> two text joins -> exact per-batch Jaccard verify.
    Nothing driver-side scales with the corpus or the pair set."""
    from ..stages import setsim as ss

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tok = docs.map_batches(
        ss.explode_shingle_sets, batch_format="pyarrow", zero_copy_batch=True
    )
    df = _grouped_count(tok, key="sh", out="df").materialize()
    if df.count() <= SETSIM_BROADCAST_CAP:
        lookup: dict[str, int] = {}
        for b in df.iter_batches(batch_format="pyarrow"):
            lookup.update(zip(b["sh"].to_pylist(), b["df"].to_pylist()))
        dref = ray.put(lookup)
        # actor pool, not a task closure: the df dict deserializes once
        # per actor (stages/setsim.BroadcastPrefixer), not once per batch.
        # max_restarts=0 DELIBERATELY: the ctor arg is an ObjectRef, so a
        # restart after ref loss would fail anyway (ray#53727) — fail the
        # task instead and let lineage re-execution rebuild the pool.
        prefixes = docs.map_batches(
            ss.BroadcastPrefixer, fn_constructor_args=(dref,),
            batch_format="pyarrow", zero_copy_batch=True,
            concurrency=_apool(), max_restarts=0,
        )
    else:
        # explode rows ~ tokens/doc x n_docs; df side is vocabulary-sized
        n_parts = dd.adaptive_partitions(
            _table_rows(sf_dir, "documents") * 120
        )
        tok_df = sj.safe_join(tok, df, join_type="inner",
                              num_partitions=n_parts, on=("sh",))
        prefixes = tok_df.groupby("doc_id").map_groups(
            lambda g: ss.prefix_select(g, ss.SETSIM_TAU),
            batch_format="pyarrow",
        )
    # bucket key = crc32 of the shingle, NOT the ~25-byte string: the
    # candidate shuffle moves int64s and the sort compares ints. A 32-bit
    # collision merely merges two buckets (a candidate SUPERSET — the
    # exact verify below removes any false pair), so correctness is
    # collision-proof while the shuffle shrinks ~2x.
    def hash_sh(t: pa.Table) -> pa.Table:
        import zlib

        hs = [zlib.crc32(s.encode("utf-8"))
              for s in t["sh"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"],
             "sh64": pa.array(hs, pa.int64()),
             "content_md5": t["content_md5"]}
        )

    cands = prefixes.map_batches(
        hash_sh, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("sh64").map_groups(
        lambda g: dd.bucket_pairs(g, max_bucket=ss.SETSIM_MAX_BUCKET),
        batch_format="pyarrow",
    )
    pairs = _distinct_pairs(cands)
    if stats_out is not None:
        # bench instrumentation: the distinct candidate count is THE
        # subquadratic-behavior evidence (candidates/doc must stay flat
        # as the corpus grows) — computed only when asked, so the
        # oracle-gate path stays single-lineage
        pairs = pairs.materialize()
        stats_out["n_candidates"] = pairs.count()
    return (
        dd.attach_pair_texts(pairs, docs)
        .map_batches(dd.jaccard_pairs_batch, batch_format="pyarrow")
        .filter(expr=f"jaccard >= {ss.SETSIM_TAU}")
    )


def q_ngram_novelty(sf_dir: str):
    """Per-document n-gram novelty — the share of a doc's distinct
    word-3-gram shingles that occur NOWHERE else in the corpus (df = 1).
    Low novelty = boilerplate/templated/syndicated content even when no
    single near-dup partner exists; it's the corpus-level complement to
    pairwise dedup. Dataflow: the setsim explode (per-doc distinct
    shingles) -> df count (salted Arrow C++ groupby) -> hash join df
    back on shingle -> one bounded groupby(doc_id) (a doc's own
    shingles) computing n_shingles / n_unique / novelty. Shuffles keyed
    by shingle then doc_id — both well-spread at 10^12 docs."""
    from ..stages import setsim as ss

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tok = docs.map_batches(
        ss.explode_shingle_sets, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "sh"])
    df = _grouped_count(tok, key="sh", out="df")
    n_parts = dd.adaptive_partitions(_table_rows(sf_dir, "documents") * 120)
    joined = sj.safe_join(tok, df, join_type="inner",
                          num_partitions=n_parts, on=("sh",))

    def per_doc(g: pa.Table) -> pa.Table:
        n = g.num_rows
        uniq = int(
            pc.sum(pc.cast(pc.equal(g["df"], pa.scalar(1)), pa.int64()))
            .as_py()
        )
        return pa.table(
            {
                "doc_id": g["doc_id"].slice(0, 1),
                "n_shingles": pa.array([n], pa.int64()),
                "n_unique": pa.array([uniq], pa.int64()),
                "novelty": pa.array([round(uniq / n, 6)], pa.float64()),
            }
        )

    return joined.groupby("doc_id").map_groups(per_doc,
                                               batch_format="pyarrow")


def q_syndication_pairs(sf_dir: str):
    """Source-pair syndication network: which pairs of sources/domains
    publish near-identical documents, and how often — the signal a crawl
    operator uses to spot wire-service mirrors and scraper farms before
    paying for near-dup removal per document. Built on the EXACT
    set-similarity pair set (``setsim_join``), so the edge weights are
    deterministic ground truth, not LSH-probabilistic.

    Dataflow: setsim pairs -> two hash joins on doc_id to attach each
    side's source (pair-set-sized, never the corpus) -> normalize the
    source pair (lexicographic least/greatest so the edge is undirected)
    -> groupby count. Self-pairs (both docs from one source) are kept:
    a source syndicating itself is the intra-site duplication signal."""
    pairs = q_setsim_join(sf_dir).select_columns(["a", "b"]).materialize()
    srcs = _read(sf_dir, "documents", ["doc_id", "source"])
    n_parts = dd.adaptive_partitions(pairs.count())
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    j1 = sj.safe_join(
        pairs, srcs, join_type="inner", num_partitions=n_parts,
        on=("a",), right_on=("doc_id",), left_schema=pair_schema,
    ).rename_columns({"source": "src_of_a"})
    j2 = sj.safe_join(
        j1, srcs, join_type="inner", num_partitions=n_parts,
        on=("b",), right_on=("doc_id",),
    ).rename_columns({"source": "src_of_b"})

    def norm(t: pa.Table) -> pa.Table:
        sa = t["src_of_a"].to_pylist()
        sb = t["src_of_b"].to_pylist()
        return pa.table(
            {
                "src_a": pa.array([min(x, y) for x, y in zip(sa, sb)],
                                  pa.string()),
                "src_b": pa.array([max(x, y) for x, y in zip(sa, sb)],
                                  pa.string()),
            }
        )

    return (
        j2.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_a", "src_b"])
        .aggregate(ray.data.aggregate.Count(alias_name="n_pairs"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("n_pairs"), "n_pairs",
                pc.cast(t["n_pairs"], pa.int64())),
            batch_format="pyarrow",
        )
    )


JL_OUT_DIMS = 4
EMBED_DIMS = 64


def _jl_signs() -> list[list[int]]:
    """Deterministic ±1 projection matrix (Achlioptas 2003's database-
    friendly JL variant): sign(c, d) = parity of the 60-bit md5 hash of
    'c|d' — the same keyed-parity convention as the AMS sketch, so the
    oracle replays it cell by cell."""
    return [
        [
            2 * (int(hashlib.md5(f"{c}|{d}".encode()).hexdigest()[:15], 16)
                 & 1) - 1
            for d in range(EMBED_DIMS)
        ]
        for c in range(JL_OUT_DIMS)
    ]


def q_embed_quantize(sf_dir: str):
    """Scalar int8 quantization of the embedding column — the
    compression step a 10^12-vector ANN index needs before it fits in
    cluster RAM (4x smaller than float32; the SQ counterpart of PQ).
    Pass 1 reduces the corpus to ONE 64-value per-dimension absmax
    (per-batch numpy partials as (d, m) rows -> groupby(d).max — O(dims)
    rows ever reach the driver); pass 2 is a stateless vectorized map:
    code = floor(x * 127.0 / absmax_d + 0.5) in float64, exactly the
    arithmetic DuckDB replays, so the approximate representation has an
    EXACT oracle. All-zero dimensions quantize to 0. Output: one row per
    (vec_id, d) with the int8 code (as int64 for the gate)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def absmax_partials(t: pa.Table) -> pa.Table:
        x = np.abs(
            np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        )
        m = x.max(axis=0) if len(x) else np.zeros(EMBED_DIMS)
        return pa.table(
            {
                "d": pa.array(range(EMBED_DIMS), pa.int64()),
                "m": pa.array(m, pa.float64()),
            }
        )

    am_rows = (
        emb.map_batches(
            absmax_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("d")
        .max("m")
        .take_all()
    )
    am = np.zeros(EMBED_DIMS, dtype=np.float64)
    for r in am_rows:
        am[int(r["d"])] = float(r["max(m)"])

    def quantize(t: pa.Table) -> pa.Table:
        x = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        n = len(x)
        safe = np.where(am == 0.0, 1.0, am)
        codes = np.floor(x * 127.0 / safe[None, :] + 0.5)
        codes = np.where(am[None, :] == 0.0, 0.0, codes).astype(np.int64)
        vec_ids = np.repeat(
            np.asarray(t["vec_id"].to_pylist(), dtype=np.int64), EMBED_DIMS
        )
        ds = np.tile(np.arange(EMBED_DIMS, dtype=np.int64), n)
        return pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "d": pa.array(ds, pa.int64()),
                "code": pa.array(codes.ravel(), pa.int64()),
            }
        )

    return emb.map_batches(
        quantize, batch_format="pyarrow", zero_copy_batch=True
    )


EMBED_QUANTIZE_SQL = f"""
with u as (
  select vec_id, embedding,
         unnest(generate_series(1, {EMBED_DIMS})) as i
  from embeddings),
m as (
  select i, max(abs(embedding[i]::double)) as am
  from u group by i)
select u.vec_id, u.i - 1 as d,
       (case when m.am = 0 then 0
             else floor(embedding[u.i]::double * 127.0 / m.am + 0.5)
        end)::bigint as code
from u join m using (i)
"""


def q_embed_project(sf_dir: str):
    """Johnson–Lindenstrauss random projection of the embedding column
    (64-d -> 4-d) with a deterministic signed matrix — the dimension-
    reduction front of an ANN/visualization pipeline, kept exactly
    SQL-replayable: component c = 0.25 * sum_d sign(c,d) * v_d, summed
    SEQUENTIALLY over d (matching DuckDB's list_sum order — np.dot's
    pairwise summation would differ in the last ulp and break the hash
    gate). Stateless map, no shuffle; the sign matrix is built once per
    task from md5, never shipped."""
    signs = _jl_signs()

    def f(t: pa.Table) -> pa.Table:
        vecs = t["embedding"].to_pylist()
        cols: dict[str, list[float]] = {f"p{c}": [] for c in
                                        range(JL_OUT_DIMS)}
        for v in vecs:
            for c in range(JL_OUT_DIMS):
                s = 0.0
                sg = signs[c]
                for d in range(EMBED_DIMS):
                    s = s + sg[d] * v[d]
                cols[f"p{c}"].append(round(0.25 * s, 6))
        out = {"vec_id": t["vec_id"]}
        for c in range(JL_OUT_DIMS):
            out[f"p{c}"] = pa.array(cols[f"p{c}"], pa.float64())
        return pa.table(out)

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_dedup_minhash_est(sf_dir: str):
    """Signature-agreement Jaccard ESTIMATE per LSH candidate pair —
    Broder's estimator E[matches/k] = J, the production alternative to
    exact text verification when documents are megabytes: the pair join
    moves two 128-slot uint64 signatures instead of the texts, and the
    verify is an integer compare-count. Same distributed shape as
    ``dedup_ngram_jaccard`` with signatures in place of texts; the
    oracle replays the full md5 minhash in SQL and counts agreeing
    slots, so the estimate itself is value-verified."""
    return _minhash_est_over_pairs(
        sf_dir, _lsh_distinct_pairs(sf_dir).materialize()
    )


def _minhash_est_over_pairs(sf_dir: str, pairs):
    """Signature-agreement estimate over a GIVEN (materialized)
    candidate-pair Dataset — the body of q_dedup_minhash_est, shared
    with q_minhash_calibration."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def pack(t: pa.Table) -> pa.Table:
        # Arrow's hash join can't carry list<uint64> payloads — pack the
        # 128-slot signature into a 1 KiB binary cell for the ride
        packed = [
            np.asarray(s, dtype=np.uint64).tobytes()
            for s in t["minhash"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "sig": pa.array(packed, pa.binary())}
        )

    sigs = docs.map_batches(
        dd.MinHasher, batch_format="pyarrow", concurrency=_apool(),
    ).map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    n_parts = dd.adaptive_partitions(pairs.count())
    j1 = sj.safe_join(
        pairs, sigs, join_type="inner", num_partitions=n_parts,
        on=("a",), right_on=("doc_id",),
        left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    ).rename_columns({"sig": "sig_a"})
    j2 = sj.safe_join(
        j1, sigs, join_type="inner", num_partitions=n_parts,
        on=("b",), right_on=("doc_id",),
    ).rename_columns({"sig": "sig_b"})

    def est(t: pa.Table) -> pa.Table:
        vals = []
        for a, b in zip(t["sig_a"].to_pylist(), t["sig_b"].to_pylist()):
            va = np.frombuffer(a, dtype=np.uint64)
            vb = np.frombuffer(b, dtype=np.uint64)
            vals.append(round(int((va == vb).sum()) / dd.NUM_PERM, 6))
        return pa.table(
            {"a": t["a"], "b": t["b"],
             "est_jaccard": pa.array(vals, pa.float64())}
        )

    return j2.map_batches(est, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (sim >= 0.95), exact within label
    buckets — SQL-verifiable with list_cosine_similarity."""

    def f(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        return sim.embedding_neardup_pairs(ids, M, threshold=0.35)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    # co-locate each label bucket (the pre-partitioning assumption: near
    # dups share a coarse bucket; here the synthetic label is the bucket)
    out = ds.groupby("label").map_groups(lambda g: f(g), batch_format="pyarrow")
    # stays a Dataset end-to-end (pair sets are unbounded in principle);
    # the union with a typed empty table guarantees the (a, b) int64
    # schema even when no pair clears the threshold
    empty = rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    return out.select_columns(["a", "b"]).union(empty)


DECON_SEM_TAU = 0.3  # max benchmark cosine at/above this = contaminated
DECON_SEM_MOD = 25  # vec_id % this == 0 picks the benchmark rows


def q_decontaminate_semantic(sf_dir: str):
    """SEMANTIC benchmark decontamination (the embedding-space
    counterpart of `decontaminate`/`decontaminate_ngram`): flag corpus
    docs whose embedding is too close to ANY benchmark item, catching
    paraphrased eval leakage that n-gram overlap misses. The benchmark
    matrix is tiny by definition (it's the eval set) — loaded once on
    the driver, L2-normalized, and shipped as plain constructor values
    to an actor-pool map (restart-safe, ray#53727); each batch is one
    numpy matmul + row-max. One streaming pass, NO shuffle — at 10^12
    docs this is read-bound. The threshold applies to the 4-dp-rounded
    similarity so float noise can't flip boundary docs vs the oracle."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(
        _pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    mask = np.asarray(t["vec_id"].to_pylist()) % DECON_SEM_MOD == 0
    bench_rows = pc.take(
        t["embedding"], pa.array(np.nonzero(mask)[0])
    ).to_pylist()

    class Score:
        def __init__(self, bench_rows: list[list[float]]):
            b = np.asarray(bench_rows, dtype=np.float64)
            self.Bn = b / np.linalg.norm(b, axis=1, keepdims=True)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            keep = ids % DECON_SEM_MOD != 0
            ids = ids[keep]
            M = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)[
                keep
            ]
            if len(ids) == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "max_sim": pa.array([], pa.float64()),
                        "contaminated": pa.array([], pa.bool_()),
                    }
                )
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            mx = np.round(Mn @ self.Bn.T, 4).max(axis=1)
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "max_sim": pa.array(mx, pa.float64()),
                    "contaminated": pa.array(
                        mx >= DECON_SEM_TAU, pa.bool_()
                    ),
                }
            )

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        Score,
        fn_constructor_args=(bench_rows,),
        batch_format="pyarrow",
        concurrency=_apool(),
    )



N_QUERIES = 10
KNN_K = 5
