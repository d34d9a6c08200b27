"""Named pipelines over the driver test tables + their DuckDB oracles.

Every entry here is exposed through ``__ray_entry__.queries()`` /
``oracle_sql()``. Each callable takes ``sf_dir`` (a directory holding the
TPC-H-ish parquet tables ``region nation customer supplier part orders
lineitem events documents embeddings``) and returns a Dataset / Arrow
table / pandas DataFrame whose row set matches the oracle SQL exactly
(same column names, values rounded identically on both sides).

Coverage maps to SURVEY.md §2 plus the training-data operator family
(dedup / similarity / text analysis / multimodal) that a 100 TB pipeline
needs. Everything is value-verified — including MinHash-LSH / SimHash
(md5 + mod-2^64 arithmetic in pure SQL), near-dup clustering (recursive-
CTE connected components), the rolling-hash winnowing fingerprint (exact
uint64 recurrence replayed in an iterative HUGEINT CTE), the fake media
decode (md5-derived), and the adaptive-extraction flagship (generator
ground-truth table) — except ``knn_ivf``, which is approximate by design
(recall < 1) and uses the rows-only check plus a pytest recall bound.
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

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read with the pandas metadata stripped AT THE
    READ: files written via pandas carry a b'pandas' metadata dict that
    makes pa.Schema unhashable, which defeats Ray's block-schema dedup in
    every downstream shuffle (the 'Failed to hash the schemas' warning).
    Passing the stripped, projected schema to read_parquet fixes it at the
    source — no extra map stage, and the ReadParquet op itself is clean."""
    import pyarrow.parquet as pq_

    path = _pq(sf_dir, name)
    full = pq_.read_schema(path).remove_metadata()
    schema = (
        pa.schema([full.field(n) for n in columns]) if columns else full
    )
    return rd.read_parquet(path, columns=columns, schema=schema)


def _pool(cap: int | None = None) -> int:
    """Cluster-proportional parallelism for actor pools and join/shuffle
    partition counts: ~3/4 of the session's CPUs (the rest runs the task
    stages around the pool), never more than n-2 — a pool reserving every
    core of a small session deadlocks against its read/write tasks.
    ``cap`` bounds stages whose useful parallelism is intrinsically
    limited; by default the size scales with the cluster."""
    n = int(ray.cluster_resources().get("CPU", 4))
    size = max(2, (n * 3) // 4)
    if cap is not None:
        size = min(size, cap)
    return max(1, min(size, n - 2))


def _apool(cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds ``(1, _pool(cap))``: the pool starts
    at one actor and grows toward the cluster-proportional max only while
    the operator is backlogged. A fixed pool of ~3/4 of the cluster pays
    the full actor spinup (~2 s for 24 actors) even when the input is a
    few thousand rows; at 100 TB the same pool still reaches the max."""
    return (1, _pool(cap))


def _table_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet metadata (no data read) — sizes shuffle
    partition counts to the data instead of pinning them to the cluster
    (a 25-row join sized to 24 partitions spends actor spinup to move
    kilobytes; see stages.dedup.adaptive_partitions)."""
    import pyarrow.parquet as pq_

    return pq_.ParquetFile(_pq(sf_dir, name)).metadata.num_rows


MARKERS = ["spark", "join", "merge", "window", "stream", "vector"]


# ---------------------------------------------------------------------------
# extraction-core family
# ---------------------------------------------------------------------------


def q_normalize(sf_dir: str):
    """normalize_text over documents (M1) — byte-identical vs SQL chain."""

    def f(t: pa.Table) -> pa.Table:
        arr = normalize_text_array(t["text"])
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.table({"doc_id": t["doc_id"], "text_norm": arr})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_pages_roundtrip(sf_dir: str):
    """documents -> synthetic pages (text/HTML/PDF by doc_id%3) -> parse ->
    normalize: proves the full ingest surface recovers the text
    byte-identically (S2/M2/M3 + M1)."""
    from ..functions.templates import default_vocab
    from ..pipelines.extract import prepare
    from ..sources.htmlio import build_page
    from ..sources.pdfio import build_pdf

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        html: list[bytes | None] = []
        text_out: list[str | None] = []
        for i, s in zip(ids, texts):
            mode = i % 3
            if mode == 0:
                html.append(None)
                text_out.append(s)
            elif mode == 1:
                html.append(build_page(s, title=f"doc {i}"))
                text_out.append(None)
            else:
                html.append(build_pdf(s, compress=(i % 6 == 5)))
                text_out.append(None)
        return pa.table(
            {
                "url": pa.array([str(i) for i in ids], pa.string()),
                "warc_ts": pa.array([None] * len(ids), pa.timestamp("us")),
                "html": pa.array(html, pa.binary()),
                "text": pa.array(text_out, pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["url"], pa.int64()),
                "kind": t["kind"],
                "text_norm": t["text_norm"],
            }
        )

    pages = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow"
    )
    return prepare(pages, default_vocab()).map_batches(
        finish, batch_format="pyarrow"
    )


def q_rule_extract(sf_dir: str):
    """Rule-engine semantics (M6-M8) over events.props JSON text."""
    rule = Rule(pattern=r'"k":\s*(\d+)', validation_regex=r"^\d+$")

    def f(t: pa.Table) -> pa.Table:
        vals = [rule.apply(s) or "" for s in t["props"].to_pylist()]
        return pa.table(
            {"event_id": t["event_id"], "k_value": pa.array(vals, pa.string())}
        )

    return _read(sf_dir, "events", ["event_id", "props"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_fingerprint(sf_dir: str):
    """Content fingerprint: md5 of the sorted marker-token set (the
    template-fingerprint shape, SQL-expressible variant)."""

    def f(t: pa.Table) -> pa.Table:
        out = []
        for s in t["text"].to_pylist():
            found = sorted({w for w in (s or "").split(" ") if w in MARKERS})
            out.append(hashlib.md5("|".join(found).encode()).hexdigest())
        return pa.table(
            {"doc_id": t["doc_id"], "fp": pa.array(out, pa.string())}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def q_token_count(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_quality(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.quality_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_lang_id(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.lang_id_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_fingerprint(sf_dir: str):
    """Rolling-hash winnowing fingerprint (non-SQL op: rows-only check)."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.rolling_fingerprint_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


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
    j = chunks.join(
        freq, join_type="inner", on=("ck",),
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


def adaptive_partitions_docs(sf_dir: str) -> int:
    """Shuffle partition count sized to the documents table (parquet
    metadata row count — no data read)."""
    from ..stages.dedup import adaptive_partitions

    return adaptive_partitions(_table_rows(sf_dir, "documents"))


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
    j = cc.join(qual, join_type="inner",
                num_partitions=dd.adaptive_partitions(cc.count()),
                on=("doc_id",))

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
    joined = tfs.join(
        df, join_type="inner",
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


def q_dedup_jaccard(sf_dir: str):
    """n-gram Jaccard over the LSH candidate-pair set: distributed text
    joins on doc_id (a then b) + per-batch verification — no driver-side
    text collection or pair materialization."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _lsh_distinct_pairs(sf_dir)
    return dd.attach_pair_texts(pairs, docs).map_batches(
        dd.jaccard_pairs_batch, batch_format="pyarrow"
    )


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
        tok_df = tok.join(df, join_type="inner", num_partitions=n_parts,
                          on=("sh",))
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
    joined = tok.join(df, join_type="inner", num_partitions=n_parts,
                      on=("sh",))

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
    j1 = pairs.join(
        srcs, join_type="inner", num_partitions=n_parts,
        on=("a",), right_on=("doc_id",),
    ).rename_columns({"source": "src_of_a"})
    j2 = j1.join(
        srcs, join_type="inner", num_partitions=n_parts,
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


def embed_project_oracle_sql() -> str:
    comps = []
    for c in range(JL_OUT_DIMS):
        comps.append(
            f"""round(0.25 * list_sum(
        [(case when ('0x' || substr(md5('{c}|' || (d - 1)::varchar), 1, 15)
               )::ubigint % 2 = 1 then 1 else -1 end)
         * embedding[d]::double for d in range(1, {EMBED_DIMS + 1})]),
        6) as p{c}"""
        )
    return ("select vec_id, " + ",\n       ".join(comps)
            + " from embeddings")


def q_dedup_minhash_est(sf_dir: str):
    """Signature-agreement Jaccard ESTIMATE per LSH candidate pair —
    Broder's estimator E[matches/k] = J, the production alternative to
    exact text verification when documents are megabytes: the pair join
    moves two 128-slot uint64 signatures instead of the texts, and the
    verify is an integer compare-count. Same distributed shape as
    ``dedup_ngram_jaccard`` with signatures in place of texts; the
    oracle replays the full md5 minhash in SQL and counts agreeing
    slots, so the estimate itself is value-verified."""
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
    pairs = _lsh_distinct_pairs(sf_dir).materialize()
    n_parts = dd.adaptive_partitions(pairs.count())
    j1 = pairs.join(
        sigs, join_type="inner", num_partitions=n_parts,
        on=("a",), right_on=("doc_id",),
    ).rename_columns({"sig": "sig_a"})
    j2 = j1.join(
        sigs, join_type="inner", num_partitions=n_parts,
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


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

N_QUERIES = 10
KNN_K = 5


def _query_vectors(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    order = pc.sort_indices(t["vec_id"])[:N_QUERIES]
    ids = pc.take(t["vec_id"], order).to_pylist()
    vecs = pc.take(t["embedding"], order).to_pylist()
    return {"ids": ids, "vecs": vecs}


def q_knn_brute(sf_dir: str):
    """Brute-force cosine top-k: broadcast query matrix, numpy matmul per
    batch, partial top-k per batch, final top-k per query."""
    # plain constructor values (tiny query matrix), not object-store refs:
    # restart-safe (ray#53727) and shipped once per actor either way
    q = _query_vectors(sf_dir)
    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.BruteKnn, fn_constructor_args=(q, KNN_K),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.topk_per_query(g, KNN_K), batch_format="pyarrow"
    ).select_columns(["query_id", "neighbor_id"])


KNNG_K = 5
KNNG_QBLOCK = 2048  # query rows per streamed plasma block


def _knng_final(g: pa.Table) -> pa.Table:
    """Final per-node reduce for the kNN graph: drop the self edge (sim
    exactly 1.0 but NOT guaranteed inside the top-(k+1) partial when >k
    other vectors also score 1.0 with smaller ids — hence the explicit
    filter + re-slice), keep k best by (sim desc, neighbor_id asc)."""
    qid = g["query_id"][0].as_py()
    rows = sorted(
        (
            (n, s)
            for n, s in zip(
                g["neighbor_id"].to_pylist(), g["sim"].to_pylist()
            )
            if n != qid
        ),
        key=lambda r: (-r[1], r[0]),
    )[:KNNG_K]
    return pa.table(
        {
            "vec_id": pa.array([qid] * len(rows), pa.int64()),
            "neighbor_id": pa.array([r[0] for r in rows], pa.int64()),
        }
    )


def q_knn_graph(sf_dir: str):
    """Exact cosine kNN GRAPH over the whole embedding column (every
    vector's top-k neighbors among all others) — the input to graph-based
    semantic dedup / connectivity-based curation (SemDeDup-style cluster
    audits). Partial+final shape with queries = ALL vectors: each batch
    emits partial top-(k+1) per query; the final groupby drops the self
    edge and keeps k. Exact kNN-graph is inherently O(n^2) compute — at
    10^12-doc scale you build the APPROXIMATE graph instead (q_knn_lsh /
    q_knn_ivf are the scale path; this operator is the exact counterpart
    they're measured against via q_ann_recall).

    Memory shape (round-3 VERDICT fix): the query side is STREAMED —
    ``iter_batches`` holds exactly one KNNG_QBLOCK-row block on the
    driver at a time, pre-normalizes it, and ``ray.put``s it to plasma;
    actors loop over the bounded block refs per data batch (zero-copy
    gets). No ``pq.read_table`` of the corpus on the driver, no
    corpus-sized matrix in any heap; plasma holds the block set and
    spills under pressure like any materialized dataset."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    block_refs = []
    for qb in ds.iter_batches(
        batch_size=KNNG_QBLOCK, batch_format="pyarrow"
    ):
        q_ids = np.asarray(qb["vec_id"].to_pylist(), dtype=np.int64)
        Qn = sim._normalize(
            np.asarray(qb["embedding"].to_pylist(), dtype=np.float64)
        )
        block_refs.append(ray.put((q_ids, Qn)))
    # max_restarts=0 DELIBERATELY: a lost block ref fails fast into
    # lineage re-execution instead of a doomed actor restart
    # (ray#53727; the BroadcastPrefixer precedent above)
    partials = ds.map_batches(
        sim.BlockedKnnGraph, fn_constructor_args=(block_refs, KNNG_K + 1),
        batch_format="pyarrow", concurrency=_apool(), max_restarts=0,
    )
    return partials.groupby("query_id").map_groups(
        _knng_final, batch_format="pyarrow"
    )


KNNG_ORACLE_SQL = f"""
with scored as (
  select a.vec_id as qid, b.vec_id as nid,
         round(list_cosine_similarity(a.embedding::double[],
               b.embedding::double[]), 4) as sim
  from embeddings a join embeddings b on a.vec_id <> b.vec_id),
ranked as (select *, row_number() over
             (partition by qid order by sim desc, nid asc) as rn
           from scored)
select qid as vec_id, nid as neighbor_id from ranked where rn <= {KNNG_K}
"""


# greedy k-center (farthest-point / Gonzalez) coreset selection: the
# diversity-maximizing data-selection pass (pick K exemplars so every
# point is near some exemplar). Cosine geometry; sims ranked at
# 4 dp with vec_id tie-breaks so numpy-vs-DuckDB float noise can't
# flip a pick (the knn_brute precedent).
KC_K = 8


def _kc_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def q_kcenter_sample(sf_dir: str):
    """Greedy k-center selection + assignment over the embedding column.
    Round 0 seeds with the min vec_id; each later round picks the point
    whose max-similarity to the chosen centers is LOWEST (farthest-first,
    tie-break vec_id asc). Per round: one map_batches scan emits ONE
    winner row per batch (per-batch partial argmin) and the driver
    reduces those O(num_blocks) winners — the centers themselves are a
    K-row broadcast, so K rounds cost K column scans and no shuffle.
    Output: every vector labeled with its nearest center (sim desc,
    center_id asc tie-break) — the cluster-balanced sampling frame.
    The SQL oracle replays every round with materialized CTEs."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    import pyarrow.parquet as pq_

    first = pq_.read_table(
        _pq(sf_dir, "embeddings"), columns=["vec_id"]
    )["vec_id"]
    c_ids = [int(pc.min(first).as_py())]

    def center_vec(cid: int) -> np.ndarray:
        t = pq_.read_table(
            _pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
            filters=[("vec_id", "==", cid)],
        )
        v = np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)
        return v / max(np.linalg.norm(v), 1e-12)

    C = [center_vec(c_ids[0])]
    for _ in range(1, KC_K):
        Cm = np.stack(C)
        chosen = frozenset(c_ids)

        def winners(t: pa.Table, _Cm=Cm, _chosen=chosen) -> pa.Table:
            ids, M = _kc_matrix(t)
            # already-chosen centers are out of the running (their
            # self-sim 1.0 can't win argmin anyway EXCEPT in the
            # all-identical-vectors corner, where keeping them would
            # re-pick c0 forever — the oracle excludes them too)
            keep = np.asarray([i not in _chosen for i in ids], bool)
            if not keep.any():
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "msim": pa.array([], pa.float64())}
                )
            ids, M = ids[keep], M[keep]
            msim = np.round(M @ _Cm.T, 4).max(axis=1)
            j = np.lexsort((ids, msim))[0]  # min msim, then min vec_id
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[j])], pa.int64()),
                    "msim": pa.array([float(msim[j])], pa.float64()),
                }
            )

        part = ds.map_batches(winners, batch_format="pyarrow").take_all()
        if not part:  # fewer points than KC_K
            break
        best = min(part, key=lambda r: (r["msim"], r["vec_id"]))
        c_ids.append(int(best["vec_id"]))
        C.append(center_vec(c_ids[-1]))

    Cm = np.stack(C)
    cid_arr = np.asarray(c_ids, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        ids, M = _kc_matrix(t)
        sims = np.round(M @ Cm.T, 4)
        # argmax by (sim desc, center vec_id asc): order center columns
        # by center id first, then a stable argmax over the id-sorted
        # columns returns the smallest id among ties
        order = np.argsort(cid_arr)
        sims_o = sims[:, order]
        pick = sims_o.argmax(axis=1)  # first (=min center id) max
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "center_id": pa.array(cid_arr[order][pick], pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kcenter_oracle_sql() -> str:
    """Unrolled replay of the greedy selection: c0 = min vec_id; round k
    recomputes every point's max 4-dp cosine to centers c0..c(k-1) and
    picks the (msim asc, vec_id asc) minimum. All round CTEs are
    MATERIALIZED (each is referenced by every later round). The final
    select assigns each vector to its (sim desc, center id asc) nearest
    center."""
    rounds = []
    centers_union = "select * from c0"
    for k in range(1, KC_K):
        rounds.append(f"""
m{k} as materialized (
  select e.vec_id,
         max(round(list_cosine_similarity(e.embedding::double[],
             c.emb), 4)) as msim
  from embeddings e join ({centers_union}) c on e.vec_id <> -1
  where e.vec_id not in (select cid from ({centers_union}))
  group by e.vec_id),
c{k} as materialized (
  select m.vec_id as cid, e.embedding::double[] as emb
  from m{k} m join embeddings e using (vec_id)
  order by m.msim asc, m.vec_id asc limit 1)""")
        centers_union += f" union all select * from c{k}"
    return f"""
with c0 as materialized (
  select vec_id as cid, embedding::double[] as emb from embeddings
  order by vec_id limit 1),{",".join(rounds)},
centers as materialized ({centers_union}),
scored as (
  select e.vec_id, c.cid,
         round(list_cosine_similarity(e.embedding::double[], c.emb), 4)
           as sim
  from embeddings e cross join centers c),
ranked as (select *, row_number() over
             (partition by vec_id order by sim desc, cid asc) as rn
           from scored)
select vec_id, cid as center_id from ranked where rn = 1
"""


COVER_K = 8


def q_coverage_sample(sf_dir: str):
    """Greedy vocabulary set cover: COVER_K rounds, each selecting the
    document adding the most NOT-yet-covered distinct tokens (tie →
    doc_id asc) — the classic (1−1/e)-approximate corpus subset that
    maximizes tokenizer/vocab exposure per training doc (greedy
    set-cover, Nemhauser et al. '78). Per round: the covered set is a
    small driver-held broadcast (it grows only by the chosen docs'
    vocab), one map_batches scan emits ONE winner row per batch
    (partial argmax) and the driver reduces those O(num_blocks)
    winners — K rounds cost K column scans, no shuffle, nothing
    corpus-sized on the driver. Output: (round, doc_id, n_new,
    covered_total) — the selection ledger."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    import pyarrow.parquet as pq_

    def doc_tokens(did: int) -> set[str]:
        t = pq_.read_table(
            _pq(sf_dir, "documents"), columns=["doc_id", "text"],
            filters=[("doc_id", "==", did)],
        )
        return set(dd._tokens(t["text"][0].as_py()))

    covered: set[str] = set()
    chosen: list[tuple[int, int, int]] = []  # (doc_id, n_new, total)
    for _ in range(COVER_K):
        cov = frozenset(covered)
        taken = frozenset(d for d, _, _ in chosen)

        def winners(t: pa.Table, _cov=cov, _taken=taken) -> pa.Table:
            best: tuple[int, int] | None = None  # (-n_new, doc_id)
            for did, txt in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
                if did in _taken:
                    continue
                n_new = len(set(dd._tokens(txt)) - _cov)
                key = (-n_new, did)
                if best is None or key < best:
                    best = key
            if best is None:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_new": pa.array([], pa.int64())})
            return pa.table(
                {
                    "doc_id": pa.array([best[1]], pa.int64()),
                    "n_new": pa.array([-best[0]], pa.int64()),
                }
            )

        part = ds.map_batches(winners, batch_format="pyarrow").take_all()
        if not part:
            break
        best = min(part, key=lambda r: (-r["n_new"], r["doc_id"]))
        if best["n_new"] == 0:
            break  # remaining docs add nothing — greedy is done
        covered |= doc_tokens(int(best["doc_id"]))
        chosen.append((int(best["doc_id"]), int(best["n_new"]),
                       len(covered)))

    return pa.table(
        {
            "round": pa.array(range(len(chosen)), pa.int64()),
            "doc_id": pa.array([c[0] for c in chosen], pa.int64()),
            "n_new": pa.array([c[1] for c in chosen], pa.int64()),
            "covered_total": pa.array([c[2] for c in chosen], pa.int64()),
        }
    )


def coverage_oracle_sql() -> str:
    """Unrolled replay of the greedy cover: round k scores every
    not-yet-chosen doc by distinct tokens outside the covered set
    (anti-join), picks (n_new desc, doc_id asc) limit 1, extends the
    covered CTE. All rounds materialized; zero-gain rounds yield empty
    winner CTEs, matching the engine's early stop."""
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    rounds = []
    taken_union = "select doc_id from w0"
    cov_union = "select t from fl join w0 using (doc_id)"
    for k in range(1, COVER_K):
        rounds.append(f"""
s{k} as materialized (
  select f.doc_id, count(distinct f.t)::bigint as n_new
  from fl f
  where f.doc_id not in ({taken_union})
    and f.t not in (select t from ({cov_union}))
  group by f.doc_id),
w{k} as materialized (
  select doc_id, n_new from s{k}
  order by n_new desc, doc_id asc limit 1)""")
        taken_union += f" union all select doc_id from w{k}"
        cov_union += f" union select t from fl join w{k} using (doc_id)"
    winners = " union all ".join(
        f"select {k} as round, doc_id, n_new from w{k}"
        for k in range(COVER_K)
    )
    return f"""
with toks as (select doc_id, list_distinct({tokenize}) as tk
              from documents),
fl as materialized (select doc_id, unnest(tk) as t from toks),
w0 as materialized (
  select doc_id, count(distinct t)::bigint as n_new from fl
  group by doc_id order by n_new desc, doc_id asc limit 1),{",".join(rounds)},
wins as ({winners}),
cum as (
  select w.round, w.doc_id, w.n_new,
         sum(w.n_new) over (order by w.round
                            rows unbounded preceding) as covered_total
  from wins w)
select round::bigint as round, doc_id, n_new,
       covered_total::bigint as covered_total
from cum
"""


MRL_HALF = 32  # EMBED_DIMS // 2; literal so the oracle slice is static


def q_embed_matryoshka(sf_dir: str):
    """Matryoshka truncation audit: for the standard query set, how many
    of the full-dimension cosine top-k survive when both sides are
    truncated to the first MRL_HALF dims — the retrieval-quality check
    before shipping truncated embeddings to cut index cost 2x (Kusupati
    et al., NeurIPS'22). One stateless pass computes BOTH similarity
    matrices per batch (the query matrices live in the task closure —
    20 tiny vectors) and emits per-mode partial top-k; the final
    groupby(query) reduces partials and counts the intersection. Same
    4-dp + neighbor-id tie-break discipline as every knn oracle."""
    q = _query_vectors(sf_dir)
    qids = np.asarray(q["ids"], dtype=np.int64)
    Qf = np.asarray(q["vecs"], dtype=np.float64)
    Qf = Qf / np.maximum(np.linalg.norm(Qf, axis=1, keepdims=True), 1e-12)
    Qh = np.asarray(q["vecs"], dtype=np.float64)[:, :MRL_HALF]
    Qh = Qh / np.maximum(np.linalg.norm(Qh, axis=1, keepdims=True), 1e-12)

    def partials(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        out_q, out_n, out_s, out_m = [], [], [], []
        for mode, Q, X in (("full", Qf, M), ("half", Qh, M[:, :MRL_HALF])):
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12
            )
            sims = np.round(Q @ Xn.T, 4)
            k = min(KNN_K, sims.shape[1])
            for qi in range(sims.shape[0]):
                order = sorted(
                    range(sims.shape[1]),
                    key=lambda j: (-sims[qi, j], ids[j]),
                )[:k]
                for j in order:
                    out_q.append(int(qids[qi]))
                    out_n.append(int(ids[j]))
                    out_s.append(float(sims[qi, j]))
                    out_m.append(mode)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
                "mode": pa.array(out_m, pa.string()),
            }
        )

    def overlap(g: pa.Table) -> pa.Table:
        tops: dict[str, set[int]] = {}
        for mode in ("full", "half"):
            sub = g.filter(pc.equal(g["mode"], mode))
            rows = sorted(
                zip(sub["neighbor_id"].to_pylist(),
                    sub["sim"].to_pylist()),
                key=lambda r: (-r[1], r[0]),
            )[:KNN_K]
            tops[mode] = {r[0] for r in rows}
        return pa.table(
            {
                "query_id": pa.array([g["query_id"][0].as_py()],
                                     pa.int64()),
                "n_overlap": pa.array(
                    [len(tops["full"] & tops["half"])], pa.int64()
                ),
                "k": pa.array([KNN_K], pa.int64()),
            }
        )

    return (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partials, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("query_id")
        .map_groups(overlap, batch_format="pyarrow")
    )


EMBED_MATRYOSHKA_SQL = f"""
with q as (select vec_id as qid, embedding as qe from embeddings
           order by vec_id limit {N_QUERIES}),
sf as (select q.qid, e.vec_id as nid,
              round(list_cosine_similarity(q.qe::double[],
                    e.embedding::double[]), 4) as sim
       from q cross join embeddings e),
tf as (select qid, nid from (
         select *, row_number() over
           (partition by qid order by sim desc, nid asc) as rn from sf)
       where rn <= {KNN_K}),
sh as (select q.qid, e.vec_id as nid,
              round(list_cosine_similarity(
                    (q.qe[1:{MRL_HALF}])::double[],
                    (e.embedding[1:{MRL_HALF}])::double[]), 4) as sim
       from q cross join embeddings e),
th as (select qid, nid from (
         select *, row_number() over
           (partition by qid order by sim desc, nid asc) as rn from sh)
       where rn <= {KNN_K})
select f.qid as query_id,
       coalesce(sum((h.nid is not null)::int), 0)::bigint as n_overlap,
       {KNN_K}::bigint as k
from tf f left join th h on f.qid = h.qid and f.nid = h.nid
group by f.qid
"""


PQ_M = 4              # subspaces
PQ_SUB = 16           # dims per subspace (EMBED_DIMS // PQ_M)
PQ_K = 8              # codebook entries per subspace


def _ts_minmax_footer(path: str, col: str):
    """(min_us, max_us) of a timestamp column from parquet ROW-GROUP
    FOOTER statistics only — O(row groups) metadata, never the column
    data (the ADVICE fix for the former pq.read_table driver pass; same
    footers-only discipline as q_rowgroup_prune). Returns (None, None)
    when any row group lacks stats so the caller can fall back to a
    distributed Min/Max aggregate."""
    import pyarrow.parquet as pq_

    md = pq_.ParquetFile(path).metadata
    ci = md.schema.to_arrow_schema().get_field_index(col)
    lo = hi = None
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(ci).statistics
        if st is None or not st.has_min_max:
            return None, None
        mn, mx = st.min, st.max
        # timestamp stats surface as datetime; normalize to epoch-us
        if hasattr(mn, "timestamp"):
            import calendar

            mn = calendar.timegm(mn.utctimetuple()) * 1_000_000 + mn.microsecond
            mx = calendar.timegm(mx.utctimetuple()) * 1_000_000 + mx.microsecond
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    return (int(lo), int(hi)) if lo is not None else (None, None)


def _pq_codebooks(sf_dir: str) -> np.ndarray:
    """Deterministic PQ codebooks, shape (PQ_M, PQ_K, PQ_SUB): the same
    first-512-row k-means-lite as the IVF index, run independently per
    subspace. Memoized per (path, mtime) — the query and its oracle
    composer share one build."""
    path = _pq(sf_dir, "embeddings")
    return _pq_codebooks_cached(path, os.path.getmtime(path))


@functools.lru_cache(maxsize=32)
def _pq_codebooks_cached(path: str, _mtime: float) -> np.ndarray:
    import pyarrow.parquet as pq_

    rows: list = []
    for b in pq_.ParquetFile(path).iter_batches(
        batch_size=512, columns=["embedding"]
    ):
        rows.extend(b["embedding"].to_pylist())
        if len(rows) >= 512:
            break
    X = np.asarray(rows[:512], dtype=np.float64)
    return np.stack(
        [
            sim.kmeans_lite(
                np.ascontiguousarray(X[:, m * PQ_SUB:(m + 1) * PQ_SUB]),
                n_clusters=min(PQ_K, len(X)),
            )
            for m in range(PQ_M)
        ]
    )


def q_embed_pq(sf_dir: str):
    """Product-quantization encoding of the embedding column (Jégou et
    al., TPAMI'11 — the memory side of every billion-vector ANN index):
    each vector is split into PQ_M subvectors, each assigned to its
    nearest subspace-codebook entry (6-dp-rounded Euclidean distance,
    centroid-id tie-break), and the per-vector output carries the PQ_M
    codes plus the reconstruction error — 64 floats compress to 4 codes
    (64x), and the recon_err column is the quality audit that decides
    whether the compressed index is shippable. Codebooks are a tiny
    broadcast (PQ_M x PQ_K x PQ_SUB floats) captured in the task
    closure; encoding is one stateless vectorized pass, no shuffle.
    recon_err sums the four squared rounded distances left-to-right so
    the SQL oracle replays it bit-for-bit."""
    CB = _pq_codebooks(sf_dir)  # (M, K, SUB)

    def encode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        cols: dict[str, pa.Array] = {"vec_id": pa.array(ids, pa.int64())}
        dist_r: list[np.ndarray] = []
        for m in range(PQ_M):
            S = X[:, m * PQ_SUB:(m + 1) * PQ_SUB]
            C = CB[m]
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            dr = np.round(np.sqrt(d2), 6)
            code = dr.argmin(axis=1)  # first min = lowest centroid id
            cols[f"c{m}"] = pa.array(code, pa.int64())
            dist_r.append(dr[np.arange(len(dr)), code])
        err = np.round(
            ((dist_r[0] * dist_r[0] + dist_r[1] * dist_r[1])
             + dist_r[2] * dist_r[2]) + dist_r[3] * dist_r[3],
            4,
        )
        cols["recon_err"] = pa.array(err, pa.float64())
        return pa.table(cols)

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    )


def pq_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the PQ encode: codebooks embedded as
    literals (deterministic, data-dependent — same composition contract
    as ivf_oracle_sql), assignment and reconstruction recomputed
    independently with the identical 6-dp distance round, id tie-break
    and left-to-right 4-dp error sum."""
    CB = _pq_codebooks(sf_dir)
    lits = ", ".join(
        f"({m}, {ci}, [{', '.join(repr(float(v)) for v in CB[m][ci])}]"
        f"::double[])"
        for m in range(PQ_M)
        for ci in range(CB.shape[1])
    )
    slices = ", ".join(
        f"({m}, {m * PQ_SUB + 1}, {(m + 1) * PQ_SUB})" for m in range(PQ_M)
    )
    picks = ", ".join(
        f"max(case when m = {m} then cid end)::bigint as c{m}"
        for m in range(PQ_M)
    )
    dists = ", ".join(
        f"max(case when m = {m} then dr end) as d{m}" for m in range(PQ_M)
    )
    return f"""
with cb(m, cid, cvec) as (values {lits}),
slices(m, lo, hi) as (values {slices}),
v as (select vec_id, embedding::double[] as vec from embeddings),
sub as (select v.vec_id, s.m, (v.vec[s.lo:s.hi])::double[] as sv
        from v cross join slices s),
d as (select sub.vec_id, sub.m, cb.cid,
             round(list_distance(sub.sv, cb.cvec), 6) as dr
      from sub join cb on cb.m = sub.m),
best as (select vec_id, m, cid, dr from (
    select *, row_number() over (partition by vec_id, m
                                 order by dr asc, cid asc) as rn
    from d) where rn = 1),
p as (select vec_id, {picks}, {dists} from best group by vec_id)
select vec_id, c0, c1, c2, c3,
       round(((d0 * d0 + d1 * d1) + d2 * d2) + d3 * d3, 4) as recon_err
from p
"""


def _gate_centroids(sf_dir: str) -> np.ndarray:
    """The engine's deterministic centroid build (first 512 rows,
    k-means-lite) — shared by knn_ivf and dedup_semantic so both oracles
    replicate one assignment rule. Reads only the sample rows (never the
    whole column) and memoizes per (path, mtime): one gate run has four
    callers (two queries, two oracle composers)."""
    path = _pq(sf_dir, "embeddings")
    return _gate_centroids_cached(path, os.path.getmtime(path))


@functools.lru_cache(maxsize=32)
def _gate_centroids_cached(path: str, _mtime: float) -> np.ndarray:
    import pyarrow.parquet as pq_

    rows: list = []
    for b in pq_.ParquetFile(path).iter_batches(
        batch_size=512, columns=["embedding"]
    ):
        rows.extend(b["embedding"].to_pylist())
        if len(rows) >= 512:
            break
    X = np.asarray(rows[:512], dtype=np.float64)
    return sim.kmeans_lite(X, n_clusters=min(8, len(X)))


def _centroid_literals(sf_dir: str) -> str:
    return ", ".join(
        f"({ci}, [{', '.join(repr(float(v)) for v in row)}]::double[])"
        for ci, row in enumerate(_gate_centroids(sf_dir))
    )


def ivf_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the WHOLE IVF path for a given sf dir: the
    engine's (deterministic, first-512-row k-means) centroid matrix is
    embedded as float literals, and SQL independently recomputes the
    vector-to-bucket assignment (argmin squared L2, first-centroid
    tie-break), per-query probe set (2 nearest centroids to the
    normalized query), candidate filtering, cosine ranking (round 6) and
    top-5 with neighbor-id tie-break. Centroids depend on the data, so
    the SQL is composed per sf dir (all_oracles embeds the driver's
    sf0.01 tables); everything past the centroid literals is
    value-verified."""
    import pyarrow.parquet as pq_

    emb = _pq(sf_dir, "embeddings")
    cent_rows = _centroid_literals(sf_dir)
    t = pq_.read_table(emb, columns=["vec_id"])
    qids = ", ".join(
        str(i) for i in pc.take(
            t["vec_id"], pc.sort_indices(t["vec_id"])[:N_QUERIES]
        ).to_pylist()
    )
    return f"""
with cent(cid, cvec) as (values {cent_rows}),
v as (select vec_id, embedding::double[] as vec from embeddings),
assign as (
  select vec_id, vec, cid from (
    select v.vec_id, v.vec, c.cid,
           row_number() over (
             partition by v.vec_id
             order by list_distance(v.vec, c.cvec), c.cid) as rn
    from v cross join cent c) where rn = 1),
q as (
  select vec_id as query_id,
         list_transform(vec, x -> x / sqrt(list_sum(
             list_transform(vec, y -> y * y)))) as qn,
         vec as qraw
  from v where vec_id in ({qids})),
probes as (
  select query_id, cid from (
    select q.query_id, c.cid,
           row_number() over (
             partition by q.query_id
             order by list_distance(q.qn, c.cvec), c.cid) as rn
    from q cross join cent c) where rn <= 2),
cand as (
  select q.query_id, a.vec_id as neighbor_id,
         round(list_cosine_similarity(a.vec, q.qraw), 6) as sim
  from q join probes p using (query_id)
  join assign a on a.cid = p.cid),
ranked as (
  select *, row_number() over (
      partition by query_id order by sim desc, neighbor_id asc) as rn
  from cand)
select query_id, neighbor_id, sim from ranked where rn <= {KNN_K}
"""


def q_knn_ivf(sf_dir: str):
    """IVF-bucketed ANN (scale path; recall<1 by design vs brute force —
    but the IVF computation itself is deterministic and value-verified
    against ``ivf_oracle_sql``'s full DuckDB replication)."""
    q = _query_vectors(sf_dir)
    C = _gate_centroids(sf_dir)
    # .tolist(): plain constructor values (tiny centroid matrix), not a
    # serialized numpy buffer — same restart-safety stance as BruteKnn
    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.IvfIndexKnn, fn_constructor_args=(q, C.tolist()),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.topk_per_query(g, KNN_K), batch_format="pyarrow"
    )


SEM_TAU = 0.35  # semantic-duplicate cosine threshold (6-dp rounded)


def q_dedup_semantic(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): embedding-cluster semantic dedup —
    assign every vector to its nearest k-means centroid (the same
    deterministic build/assignment as knn_ivf), then within each cluster
    keep only the min-vec_id representative of every semantic-duplicate
    set (pairwise cosine >= SEM_TAU). Centroids broadcast as plain
    values; ONE shuffle keyed by cluster; within-cluster pairing is
    O(c²) bounded by the scale contract that the centroid count grows
    with the corpus — and a cluster that overflows
    ``sim.SEM_MAX_CLUSTER`` anyway (skewed assignment) routes through
    the identical-collapse + sign-LSH sub-bucket escape hatch in
    ``similarity.semdedup_group`` instead of pairing all rows."""
    C = _gate_centroids(sf_dir)
    assigned = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.CentroidAssign, fn_constructor_args=(C.tolist(),),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return assigned.groupby("cluster").map_groups(
        lambda g: sim.semdedup_group(g, SEM_TAU), batch_format="pyarrow"
    )


def semdedup_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the WHOLE SemDeDup path: centroid literals
    (identical to the knn_ivf oracle's), argmin-L2 assignment with
    first-centroid tie-break, within-cluster pairwise cosine (round 6)
    and min-id-representative survivorship."""
    return f"""
with cent(cid, cvec) as (values {_centroid_literals(sf_dir)}),
v as (select vec_id, embedding::double[] as vec from embeddings),
assign as (
  select vec_id, vec, cid from (
    select v.vec_id, v.vec, c.cid,
           row_number() over (
             partition by v.vec_id
             order by list_distance(v.vec, c.cvec), c.cid) as rn
    from v cross join cent c) where rn = 1),
dropped as (
  select distinct b.vec_id
  from assign a join assign b on a.cid = b.cid and a.vec_id < b.vec_id
  where round(list_cosine_similarity(a.vec, b.vec), 6) >= {SEM_TAU})
select vec_id, cid as cluster from assign
where vec_id not in (select vec_id from dropped)
"""


# re-tuned with the in-engine evaluator (q_ann_recall) over the fixture
# embeddings: sweeping (tables, planes) at 1-bit multiprobe, 6x8
# dominates the old 2x6 — recall@5 0.74 vs 0.58 at the SAME ~22% scan
# fraction (8x8 buys 0.84 at 28%; 4x10 collapses recall to 0.48 at 5%).
# Planes are still data-independent, so index build stays free.
LSH_TABLES = 6
LSH_PLANES = 8


def _embedding_dim(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    head = next(
        pq.ParquetFile(_pq(sf_dir, "embeddings")).iter_batches(
            batch_size=1, columns=["embedding"]
        )
    )
    return len(head["embedding"][0])


def q_knn_lsh(sf_dir: str):
    """Multi-table sign-LSH ANN — the hyperplane-hash scale path next to
    IVF (recall < 1 by design vs brute force; the LSH computation itself
    is deterministic and value-verified against ``lsh_oracle_sql``'s
    full DuckDB replication with plane literals). Unlike IVF there is NO
    index-build pass at all: the planes depend only on the embedding
    dimension, so at 10^12 rows the pipeline is a single map_batches +
    the tiny per-query top-k reduce."""
    q = _query_vectors(sf_dir)
    tables = sim.lsh_tables(_embedding_dim(sf_dir), LSH_TABLES, LSH_PLANES)
    # .tolist(): plain constructor values (tiny plane matrices), not
    # serialized numpy buffers — same restart-safety stance as BruteKnn
    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        sim.SignLshKnn,
        fn_constructor_args=(q, [P.tolist() for P in tables], KNN_K),
        batch_format="pyarrow", concurrency=_apool(),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.topk_per_query(g, KNN_K), batch_format="pyarrow"
    )


def lsh_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the WHOLE multi-table sign-LSH ANN path:
    every table's plane matrix (data-independent — dimension + fixed
    seeds) is embedded as float literals; SQL independently recomputes
    each vector's per-table sign signature (bit = round(v·hᵢ, 6) >= 0),
    each query's per-table multiprobe set (own bucket ∪ every 1-bit
    flip), the candidate UNION across tables, cosine ranking (round 6)
    and top-k with neighbor-id tie-break."""
    tables = sim.lsh_tables(_embedding_dim(sf_dir), LSH_TABLES, LSH_PLANES)
    plane_rows = ", ".join(
        f"({tid}, {pid}, [{', '.join(repr(float(v)) for v in row)}]::double[])"
        for tid, P in enumerate(tables)
        for pid, row in enumerate(P)
    )
    return f"""
with planes(tid, pid, pvec) as (values {plane_rows}),
v as (select vec_id, embedding::double[] as vec from embeddings),
sig as (
  select vec_id, vec, p.tid,
         sum(case when round(list_inner_product(vec, p.pvec), 6) >= 0
                  then (1::bigint << p.pid) else 0 end)::bigint as bucket
  from v cross join planes p group by vec_id, vec, p.tid),
qid as (select vec_id from v order by vec_id limit {N_QUERIES}),
q as (
  select vec_id as query_id, vec as qvec, tid, bucket as qb from sig
  where vec_id in (select vec_id from qid)),
probes as (
  select query_id, tid, qb as bucket from q
  union
  select q.query_id, q.tid, xor(q.qb, 1::bigint << p.pid) as bucket
  from q join planes p using (tid)),
cand as (
  select distinct q2.query_id, s.vec_id as neighbor_id,
         round(list_cosine_similarity(s.vec, q2.qvec), 6) as sim
  from (select distinct query_id, qvec from q) q2
  join probes pr using (query_id)
  join sig s on s.tid = pr.tid and s.bucket = pr.bucket),
ranked as (
  select *, row_number() over (
      partition by query_id order by sim desc, neighbor_id asc) as rn
  from cand)
select query_id, neighbor_id, sim from ranked where rn <= {KNN_K}
"""


# ---------------------------------------------------------------------------
# relational coverage (aggregate / join / sort / distinct / window)
# ---------------------------------------------------------------------------


def q_agg_lineitem(sf_dir: str):
    """TPC-H Q1-style pricing summary: per-batch Arrow partial sums
    (combiner) then one tiny groupby over the 4 flag/status groups —
    the canonical pre-aggregate-before-shuffle reduction."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def pre(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(np.datetime64("1995-09-02", "us"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "revenue": rev,
                "l_discount": t["l_discount"],
            }
        )

    agg = (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            ray.data.aggregate.Sum("l_quantity", alias_name="sum_qty"),
            ray.data.aggregate.Sum("revenue", alias_name="sum_revenue"),
            ray.data.aggregate.Mean("l_discount", alias_name="avg_disc"),
            ray.data.aggregate.Count(alias_name="n"),
        )
    )
    df = agg.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_revenue"] = df["sum_revenue"].round(2)
    df["avg_disc"] = df["avg_disc"].round(6)
    return df


# broadcast-join routing threshold: above this the "small" side is not a
# bounded dimension any more (a dict of 5M (int, short-string) pairs is a
# few hundred MB in every actor — the ceiling of sane broadcast) and the
# plan switches to the hash-partitioned Dataset.join
BROADCAST_MAX_ROWS = 5_000_000


def q_join_revenue(sf_dir: str):
    """orders ⋈ customer, size-routed: broadcast lookup (J1 pattern) while
    customer fits the broadcast budget, hash-partitioned ``Dataset.join``
    beyond it — same result either way (asserted by the shared oracle)."""
    import pyarrow.parquet as pq_

    n_small = pq_.ParquetFile(_pq(sf_dir, "customer")).metadata.num_rows
    if n_small > BROADCAST_MAX_ROWS:
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


def skew_f2_oracle_sql() -> str:
    from ..stages.sketch import AMS_GROUPS, AMS_K

    per = AMS_K // AMS_GROUPS
    return f"""
with js as (select unnest(range({AMS_K})) as j),
sg as (
  select j, sum(case when ('0x' || substr(md5(cast(user_id as varchar)
                                           || '|' || j::varchar), 1, 15)
                          )::ubigint % 2 = 1
                     then 1 else -1 end)::hugeint as s
  from events cross join js
  where user_id is not null
  group by j),
gm as (select j // {per} as g, avg((s*s)::double) as m from sg group by 1),
est as (select median(m)::double as est_f2 from gm),
ex as (select sum(c*c)::bigint as exact_f2 from (
    select count(*)::hugeint as c from events
    where user_id is not null group by user_id))
select {AMS_K}::bigint as k, round(est.est_f2, 6) as est_f2, ex.exact_f2,
       round(abs(est.est_f2 - ex.exact_f2) / ex.exact_f2, 6) as rel_err
from est, ex
"""


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


DAY_US = 86_400_000_000
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

    def bucket_asof(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].values
        ids = g["event_id"].to_numpy(dtype="int64")
        is_click = (g["event_type"] == "click").to_numpy()
        r_ts, r_id = ts[is_click], ids[is_click]
        idx = np.searchsorted(r_ts, ts, side="left") - 1
        rows = pd.DataFrame(
            {
                "kind": "ev",
                "event_id": ids,
                "user_id": int(g["user_id"].iloc[0]),
                "day": g["day"].iloc[0],
                "ts": ts,
                "prior_click_id": [
                    int(r_id[i]) if i >= 0 else None for i in idx
                ],
                "prior_ts": [r_ts[i] if i >= 0 else None for i in idx],
            }
        )
        summary = pd.DataFrame(
            {
                "kind": ["sum"],
                "event_id": [-1],
                "user_id": [int(g["user_id"].iloc[0])],
                "day": [g["day"].iloc[0]],
                "ts": [pd.NaT],
                "prior_click_id": [int(r_id[-1]) if len(r_id) else None],
                "prior_ts": [r_ts[-1] if len(r_id) else None],
            }
        )
        # explicit schema: a bucket whose prior_click_id is ALL null
        # would otherwise produce an arrow null-typed column, and blocks
        # with divergent schemas break the downstream hash join (concat
        # at the Arrow level after the cast — pandas concat of an
        # all-NA frame is deprecated dtype-inference territory)
        def to_t(df: pd.DataFrame) -> pa.Table:
            return (
                pa.Table.from_pandas(df, preserve_index=False)
                .replace_schema_metadata(None)
                .cast(_ASOF_MIXED_SCHEMA)
            )

        return pa.concat_tables([to_t(rows), to_t(summary)])

    def carry(g: pd.DataFrame) -> pa.Table:
        """Per user: for each bucket, the latest click from EARLIER
        buckets (running forward-fill over day-sorted summaries)."""
        g = g.sort_values("day")
        prev_id = g["prior_click_id"].shift(1).ffill()
        prev_ts = g["prior_ts"].shift(1).ffill()
        out = pd.DataFrame(
            {
                "user_id": g["user_id"],
                "day": g["day"],
                "carry_id": prev_id,
                "carry_ts": prev_ts,
            }
        ).dropna(subset=["carry_id"])
        out["carry_id"] = out["carry_id"].astype("int64")
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None).cast(_ASOF_CARRY_SCHEMA)

    mixed = (
        ds.map_batches(day_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "day"])
        .map_groups(bucket_asof, batch_format="pandas")
    )

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

    carries = (
        mixed.filter(expr="kind == 'sum'")
        .groupby("user_id")
        .map_groups(carry, batch_format="pandas")
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

    def fill_group(g: pa.Table) -> pa.Table:
        kinds = g["mkind"].to_pylist()
        c_id = c_ts = None
        for i, k in enumerate(kinds):
            if k == "carry":
                c_id = g["carry_id"][i].as_py()
                c_ts = g["carry_ts"][i].as_py()
                break
        ev_ids, prior, gaps = [], [], []
        for i, k in enumerate(kinds):
            if k != "ev2":
                continue
            ev_ids.append(g["event_id"][i].as_py())
            prior.append(c_id)
            if c_ts is None:
                gaps.append(None)
            else:
                gaps.append(
                    round((g["ts"][i].as_py() - c_ts).total_seconds(), 6)
                )
        return pa.table(
            {
                "event_id": pa.array(ev_ids, pa.int64()),
                "prior_click_id": pa.array(prior, pa.int64()),
                "gap_s": pa.array(gaps, pa.float64()),
            }
        )

    tagged = unresolved.map_batches(
        tag_unresolved, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        carries.map_batches(tag_carry, batch_format="pyarrow",
                            zero_copy_batch=True)
    )
    filled = tagged.groupby(["user_id", "day"]).map_groups(
        fill_group, batch_format="pyarrow"
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

    def bucket_lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        td = (g["ts"] - g["ts"].shift(1)) / pd.Timedelta(microseconds=1)
        gaps = pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "gap_us": td,
                "kind": "gap",
                "user_id": int(g["user_id"].iloc[0]),
                "first_ts": pd.NaT,
                "last_ts": pd.NaT,
            }
        ).dropna(subset=["gap_us"])
        summary = pd.DataFrame(
            {
                "event_id": [int(g["event_id"].iloc[0])],
                "gap_us": [float("nan")],
                "kind": ["summary"],
                "user_id": [int(g["user_id"].iloc[0])],
                "first_ts": [g["ts"].iloc[0]],
                "last_ts": [g["ts"].iloc[-1]],
            }
        )
        both = pd.concat([gaps, summary], ignore_index=True)
        # return Arrow: pandas blocks carry an unhashable schema that
        # defeats Ray's block-schema dedup in the NEXT shuffle
        return pa.Table.from_pandas(
            both, preserve_index=False
        ).replace_schema_metadata(None)

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("first_ts")
        gap = (g["first_ts"] - g["last_ts"].shift(1)) / pd.Timedelta(
            microseconds=1
        )
        out = pd.DataFrame(
            {"event_id": g["event_id"].astype("int64"), "gap_us": gap}
        ).dropna()
        out["gap_us"] = out["gap_us"].astype("int64")
        return out

    mixed = (
        ds.map_batches(day_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "day"])
        .map_groups(bucket_lag, batch_format="pandas")
    )

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
    boundary = (
        mixed.filter(expr="kind == 'summary'")
        .groupby("user_id")
        .map_groups(stitch, batch_format="pandas")
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

    def bucket_summary(g) -> "pa.Table":
        g = g.sort_values("ts")
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0)
        import pandas as pd

        return pa.Table.from_pandas(pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "day": [g["day"].iloc[0]],
                "n_events": [len(g)],
                "n_sessions": [int((gaps > SESSION_GAP_S).sum()) + 1],
                "first_ts": [g["ts"].iloc[0]],
                "last_ts": [g["ts"].iloc[-1]],
            }
        ), preserve_index=False).replace_schema_metadata(None)

    def stitch(g) -> "pa.Table":
        import pandas as pd

        g = g.sort_values("day")
        boundary_gaps = (
            g["first_ts"].shift(-1) - g["last_ts"]
        ).dt.total_seconds().dropna()
        merged = int((boundary_gaps <= SESSION_GAP_S).sum())
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [int(g["n_events"].sum())],
                "n_sessions": [int(g["n_sessions"].sum()) - merged],
            }
        )

    buckets = (
        ds.map_batches(day_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "day"])
        .map_groups(bucket_summary, batch_format="pandas")
    )
    return buckets.groupby("user_id").map_groups(stitch, batch_format="pandas")


# ---------------------------------------------------------------------------
# multimodal stub plumbing
# ---------------------------------------------------------------------------


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


def q_media_frames(sf_dir: str):
    """Video frame-sampling plumbing: synthesize per-doc duration/fps
    deterministically from the documents table, explode to sampled frame
    rows (the fan-out a real frame decoder consumes). Fully
    SQL-expressible -> oracle-verified."""
    from ..stages.media import frame_explode_batch

    def meta(t: pa.Table) -> pa.Table:
        n = t["n_chars"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                # deterministic fake media metadata from row stats
                "duration_s": pc.cast(
                    pc.add(pc.divide(pc.cast(n, pa.float64()), 100.0), 1.0),
                    pa.float64(),
                ),
                "fps": pa.array([30.0] * len(t), pa.float64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(meta, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(lambda t: frame_explode_batch(t, every_n=30),
                     batch_format="pyarrow")
    )


def q_sample_systematic(sf_dir: str):
    """Deterministic systematic sampling (every 10th key) — the reproducible
    sampling primitive (seeded random_sample exists in Ray but cannot be
    hash-compared against SQL)."""
    return _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 7), 0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# per-language keep rates out of 1000 (a corpus-rebalancing sample:
# downsample the head language, keep more of the tail). Deterministic:
# the keep decision hashes ONLY the row key, so it is reproducible
# across runs, workers, and in SQL.
STRATIFIED_RATES = {"en": 200, "_default": 600}


def q_sample_stratified(sf_dir: str):
    """Deterministic stratified sampling by language: keep a row iff
    md5(doc_id) mod 1000 < rate(lang). The rebalancing step of a
    multilingual pretraining mix, as one vectorized filter — no shuffle,
    no RNG state."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        mask = [
            int.from_bytes(
                _hl.md5(str(i).encode()).digest()[:4], "big"
            ) % 1000
            < STRATIFIED_RATES.get(lang, STRATIFIED_RATES["_default"])
            for i, lang in zip(ids, langs)
        ]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


VOCAB_TOP_K = 50


def q_top_terms(sf_dir: str):
    """Corpus vocabulary building: per-batch partial term counts ->
    grouped Sum -> global top-K with deterministic tie-break (the
    tokenizer-vocab construction step of a pretraining pipeline)."""

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
    # web-scale vocabularies are billions of terms: never materialize the
    # count table — per-block top-K partials + one tiny final reduce
    return dataset_topk(
        agg, [("n", "descending"), ("term", "ascending")], VOCAB_TOP_K
    )


def q_curate(sf_dir: str):
    """End-to-end training-data curation: quality gate -> language gate ->
    exact dedup (keep min doc_id) -> per-doc features. The composition a
    100 TB pretraining pipeline runs; every stage is the corresponding
    operator from this repo chained in one streaming dataflow."""

    def features(t: pa.Table) -> pa.Table:
        q = tx.quality_batch(t)
        lang = tx.lang_id_batch(t)
        h = tx.content_hash_batch(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": q["n_tokens"],
                "stop_ratio": q["stop_ratio"],
                "predicted_lang": lang["predicted_lang"],
                "content_md5": h["content_md5"],
            }
        )

    ds = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(features, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["n_tokens"], 20),
                    pc.equal(t["predicted_lang"], "en"),
                )
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    kept = ds.groupby("content_md5").aggregate(
        ray.data.aggregate.Min("doc_id", alias_name="doc_id"),
        ray.data.aggregate.Min("n_tokens", alias_name="n_tokens"),
    )
    return kept.select_columns(["doc_id", "n_tokens"])


def q_curate_neardup(sf_dir: str):
    """The COMPLETE curation composition: quality + language gate ->
    exact dedup (keep min doc_id per content hash) -> MinHash-LSH
    near-dup clustering over the survivors -> keep the best member per
    cluster (max tokens, tie min doc_id). Every stage is the
    corresponding standalone operator chained as one dataflow; the final
    subtraction is a hash-partitioned ``left_anti`` join, so nothing
    driver-side scales with the corpus.

    Stage builders live in pipelines/curate.py, shared with the
    CHECKPOINTED form (`curate.curate_neardup_checkpointed`) that a
    multi-day 100 TB run uses — one dataflow definition, two execution
    protocols (single lineage here for the oracle gate; stage-boundary
    parquet + ``_done``-marker resume there)."""
    from .curate import curate_neardup_chain

    return curate_neardup_chain(sf_dir)


# ---------------------------------------------------------------------------
# the adaptive-extraction flagship over the synthetic CC-style corpus
# ---------------------------------------------------------------------------


FLAGSHIP_N = 2000


def flagship_corpus(n: int = FLAGSHIP_N) -> tuple[str, str]:
    """Lazily write the deterministic flagship corpus (pages + expected
    ground truth) to a fixed, sf-independent path; returns
    (pages_dir, expected_dir). Called by both the Ray query and the
    oracle-SQL composer so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_corpus

    root = os.path.join(tempfile.gettempdir(), f"aper_flagship_{n}")
    return write_corpus(root, n=n, seed=1, shard_rows=500)


def q_extract_synthetic(sf_dir: str):
    """Full two-wave adaptive extraction over the deterministic synthetic
    pages corpus (cold start: fit + apply). Value-verified: the oracle is
    a SELECT over the generator's independent ``expected`` ground-truth
    table (url, fingerprint via DuckDB md5 over the sorted label set,
    expected_norm_json as extracted_json, expected_text as text_norm,
    n_missing = 0), so a single wrong field value, missed null, or
    normalization drift on any of the 2000 docs fails the hash."""
    import tempfile

    from ..pipelines.extract import extract_pages

    pages_dir, _ = flagship_corpus()
    work = tempfile.mkdtemp(prefix="aper_work_")
    res = extract_pages(rd.read_parquet(pages_dir), work, write_answers=False,
                        concurrency=_apool(), batch_size=1024)
    return res["answers"].select_columns(
        ["url", "fingerprint", "extracted_json", "text_norm", "n_missing"]
    )


def card_corpus(n: int = 500) -> tuple[str, str]:
    """Lazily write the detached-header card-PDF corpus (grid-extraction
    driver gate); fixed sf-independent path like flagship_corpus."""
    import tempfile

    from ..sources.synthetic import write_card_corpus

    root = os.path.join(tempfile.gettempdir(), f"aper_cards_{n}")
    return write_card_corpus(root, n=n, seed=1)


def q_extract_grid_cards(sf_dir: str):
    """Grid-extraction pipeline mode over detached-header card PDFs
    (labels and values on separate x-aligned lines — invisible to any
    linear text path; the layouts the reference pays an LLM for).
    Value-verified against the generator's independent ground truth."""
    import tempfile

    from ..pipelines.extract import extract_pages

    pages_dir, _ = card_corpus()
    work = tempfile.mkdtemp(prefix="aper_cards_work_")
    res = extract_pages(rd.read_parquet(pages_dir), work, write_answers=False,
                        pdf_layout="grid", concurrency=_apool())
    return res["answers"].select_columns(["url", "extracted_json", "n_missing"])


def _card_oracle_sql() -> str:
    _, exp_dir = card_corpus()
    return f"""
        select url, expected_json as extracted_json, 0 as n_missing
        from read_parquet('{exp_dir}/*.parquet')
    """


def _flagship_oracle_sql() -> str:
    """Reproduce the engine-side answer table from the generator's ground
    truth, independently of the extraction code path: the template
    fingerprint (md5 of the sorted '|'-joined anchor-label set,
    ``functions/templates.py:108-113``) is recomputed by DuckDB's own
    ``md5()`` over label-set string literals derived from the template
    registry — not from any engine-computed hash."""
    from ..functions.templates import TEMPLATE_FIELDS, field_label

    _, exp_dir = flagship_corpus()
    whens = " ".join(
        "when '{}' then substr(md5('{}'), 1, 16)".format(
            label, "|".join(sorted(field_label(f) for f in fields))
        )
        for label, fields in sorted(TEMPLATE_FIELDS.items())
    )
    return f"""
        select url,
               case label {whens} end as fingerprint,
               expected_norm_json as extracted_json,
               expected_text as text_norm,
               0 as n_missing
        from read_parquet('{exp_dir}/*.parquet')
    """


# ---------------------------------------------------------------------------
# decontamination / repetition-quality / quantiles / global rank
# ---------------------------------------------------------------------------

# benchmark-phrase derivation: docs with doc_id % DECON_MOD == 0 below an
# ABSOLUTE id bound contribute one 32-char phrase each — the benchmark set
# is bounded by construction (<= DECON_MAX_ID / DECON_MOD phrases) and
# never scales with the corpus, mirroring a real decontamination set
# (a fixed eval benchmark, not a corpus-sized side input)
DECON_MOD = 97
DECON_MAX_ID = 10_000
DECON_OFF = 7  # 0-based start of the phrase slice (SQL substr(text, 8, 32))
DECON_LEN = 32


def _decon_phrases(sf_dir: str) -> list[str]:
    """Distinct benchmark phrases, sorted for determinism. The filtered
    set is <= DECON_MAX_ID/DECON_MOD rows regardless of corpus size, so
    the driver-side collection is bounded (broadcast-small-side)."""
    src = _read(sf_dir, "documents", ["doc_id", "text"])

    def slice_phrase(t: pa.Table) -> pa.Table:
        m = pa.scalar(DECON_MOD, pa.int64())
        mod = pc.subtract(  # doc_id % DECON_MOD, vectorized
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], m), m)
        )
        keep = pc.and_(
            pc.equal(mod, pa.scalar(0, pa.int64())),
            pc.less(t["doc_id"], pa.scalar(DECON_MAX_ID, pa.int64())),
        )
        t = t.filter(keep)
        out = [
            txt[DECON_OFF:DECON_OFF + DECON_LEN]
            for txt in t["text"].to_pylist()
            if txt is not None and len(txt) >= DECON_OFF + 1 + DECON_LEN
        ]
        return pa.table({"phrase": pa.array(out, pa.string())})

    rows = src.map_batches(slice_phrase, batch_format="pyarrow").take_all()
    return sorted({r["phrase"] for r in rows})


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (the GPT-3 / Pile training-set hygiene
    step): flag every document containing any benchmark phrase. The
    bounded phrase set is shipped as plain constructor values to an
    autoscaling actor pool; matching is one vectorized
    ``pc.match_substring`` kernel per phrase per batch."""
    phrases = _decon_phrases(sf_dir)
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.Decontaminate, fn_constructor_args=(phrases,),
        batch_format="pyarrow", concurrency=_apool(), zero_copy_batch=True,
    )


def q_word_stats(sf_dir: str):
    """Gopher-style repetition-quality features per doc (word count,
    distinct words, most-frequent word + its fraction, duplicate-word
    fraction) — embarrassingly parallel map_batches, no shuffle."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.word_stats_batch, batch_format="pyarrow", zero_copy_batch=True,
    )


def q_repetition_signals(sf_dir: str):
    """Gopher-style within-doc repetition gate signals (duplicate-line
    count/char fractions, top/dup word bi- and trigram fractions) —
    embarrassingly parallel map_batches, no shuffle. Complements
    ``quality_gopher`` (word-level fracs) with the line- and n-gram-level
    signals of the Gopher Table-A1 filter set."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.repetition_signals_batch, batch_format="pyarrow",
        zero_copy_batch=True,
    )


DOMAIN_QUOTA = 10


def q_domain_quota(sf_dir: str):
    """Per-domain quota sampling — the CC-curation step that caps any one
    crawl domain's contribution to the training mix: keep at most
    ``DOMAIN_QUOTA`` docs per ``source``, chosen by a deterministic
    md5(doc_id) ranking (content- and order-independent, so reruns and
    shards agree). Scale shape = grouped top-N without a global sort:
    each batch forwards only its N smallest-ranked rows per source
    (vectorized run-length mask over a sorted batch), the
    groupby(source) shuffle then moves <= N x blocks rows per domain —
    never the corpus — and a tiny map_groups takes the final N."""

    def partial(t: pa.Table) -> pa.Table:
        h = tx.md5_hex_array(
            [str(v) for v in t["doc_id"].to_pylist()]
        )
        t = t.append_column("rank_hash", h)
        idx = pc.sort_indices(
            t, sort_keys=[("source", "ascending"), ("rank_hash", "ascending")]
        )
        t = t.take(idx)
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        if len(src) == 0:
            return t
        new_run = np.r_[True, src[1:] != src[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank_in_run = np.arange(len(src)) - starts[run_id]
        return t.filter(pa.array(rank_in_run < DOMAIN_QUOTA))

    def final(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("rank_hash", "ascending")])
        g = g.take(idx.slice(0, DOMAIN_QUOTA))
        return g.select(["doc_id", "source"])

    return (
        _read(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# link graph (outlinks / in-degree / PageRank over the synthetic mini-web)
# ---------------------------------------------------------------------------

LINK_N = 200
LINK_HREF_RE = re.compile(r'href="([^"]*)"')
PR_ITERS = 5
# Fixed-point PageRank: ranks live in integer 1e-9 units and damping is
# the exact rational 85/100, so every route (driver dict loop,
# distributed join+groupby, SQL oracle) does the SAME integer floor
# divisions and order-independent integer sums — bit-equality with no
# float-summation-order or round-half-mode hazards anywhere. The <=1e-9
# mass floored away per edge per round is deterministic and irrelevant
# to ranking.
PR_SCALE = 10 ** 9
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def link_corpus(n: int = LINK_N) -> str:
    """Lazily write the deterministic hyperlinked corpus (sf-independent
    fixed path, like flagship_corpus); both the Ray queries and the
    oracle composer call this, so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_link_corpus

    root = os.path.join(tempfile.gettempdir(), f"aper_links_{n}")
    return write_link_corpus(root, n=n, seed=1)


def _outlinks_ds(pages_dir: str):
    """(src, dst) edge list: every href occurrence in every page's HTML
    (multigraph — duplicates kept, exactly what regexp_extract_all
    yields on the oracle side). The per-row finditer is inherent parse
    work over an opaque binary column, same shape as the PDF/HTML
    parsers; the regex is compiled once at module import."""

    def f(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        dsts: list[str] = []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for m in LINK_HREF_RE.finditer(h.decode("utf-8")):
                srcs.append(u)
                dsts.append(m.group(1))
        return pa.table(
            {
                "src": pa.array(srcs, pa.string()),
                "dst": pa.array(dsts, pa.string()),
            }
        )

    return rd.read_parquet(pages_dir, columns=["url", "html"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_outlinks(sf_dir: str):
    """Outlink extraction from raw HTML — the URL-frontier feed of a
    crawl/curation pipeline. Embarrassingly parallel; no shuffle."""
    return _outlinks_ds(link_corpus())


def q_link_indegree(sf_dir: str):
    """In-degree per target url (link-popularity rollup): one groupby
    over the edge list; shuffle moves (dst, partial count) only."""
    return (
        _outlinks_ds(link_corpus())
        .groupby("dst")
        .aggregate(ray.data.aggregate.Count(alias_name="in_degree"))
        .map_batches(
            lambda t: pa.table(
                {
                    "url": t["dst"],
                    "in_degree": pc.cast(t["in_degree"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def q_external_link_ratio(sf_dir: str):
    """External-link ratio per page (the link-spam / SEO-farm signal:
    pages whose outlinks mostly leave the site). Host extraction uses
    split_part semantics shared verbatim with the oracle; the ratio is
    emitted in integer PARTS-PER-MILLION via floor division — no float
    rounding anywhere, so both engines agree bit-for-bit. Per-batch
    (src, n, n_ext) partials make the one groupby(src) shuffle move
    counters, never urls."""

    def _host(u: str) -> str:
        parts = u.split("://", 1)
        rest = parts[1] if len(parts) == 2 else ""
        return rest.split("/", 1)[0]

    def partials(t: pa.Table) -> pa.Table:
        agg: dict[str, list[int]] = {}
        for s, d in zip(t["src"].to_pylist(), t["dst"].to_pylist()):
            c = agg.setdefault(s, [0, 0])
            c[0] += 1
            if _host(d) != _host(s):
                c[1] += 1
        return pa.table(
            {
                "src": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array([v[0] for v in agg.values()], pa.int64()),
                "n_ext": pa.array([v[1] for v in agg.values()], pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        n = t["sum(n)"]
        n_ext = t["sum(n_ext)"]
        ppm = pc.divide(
            pc.multiply(n_ext, pa.scalar(1_000_000, pa.int64())), n
        )
        return pa.table(
            {
                "url": t["src"],
                "n_links": n,
                "n_external": n_ext,
                "ext_ppm": ppm,
            }
        )

    return (
        _outlinks_ds(link_corpus())
        .map_batches(partials, batch_format="pyarrow")
        .groupby("src")
        .sum(["n", "n_ext"])
        .map_batches(finish, batch_format="pyarrow")
    )


def external_link_ratio_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
e as (select src, dst,
             split_part(split_part(src, '://', 2), '/', 1) as sh,
             split_part(split_part(dst, '://', 2), '/', 1) as dh
      from l)
select src as url, count(*)::bigint as n_links,
       sum(case when dh <> sh then 1 else 0 end)::bigint as n_external,
       ((sum(case when dh <> sh then 1 else 0 end) * 1000000)
         // count(*))::bigint as ext_ppm
from e group by src
"""


PR_DRIVER_EDGE_LIMIT = 1_000_000


def _grouped_sum_str(ds, key: str, val: str, out: str, n_parts: int):
    """groupby(key).sum(val) for a STRING key via salt-partition + Arrow
    C++ ``group_by`` — the string twin of ``dedup._grouped_min`` (the
    label-propagation fast path): ``Dataset.groupby().aggregate(Sum)``
    combines rows at Python speed and dominates iterative rounds. The
    salt is a deterministic crc32 of the key, so all rows of a key land
    in one partition: exact."""
    import zlib

    def salt(t: pa.Table) -> pa.Table:
        p = pa.array(
            [zlib.crc32(s.encode("utf-8")) % n_parts
             for s in t[key].to_pylist()],
            pa.int64(),
        )
        return t.append_column("p", p)

    def sm(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # empty salt partition: keep the schema typed
            return pa.table(
                {key: pa.array([], pa.string()),
                 out: pa.array([], pa.int64())}
            )
        r = g.select([key, val]).group_by(key).aggregate([(val, "sum")])
        return r.rename_columns([key, out])

    return (
        ds.map_batches(salt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p")
        .map_groups(sm, batch_format="pyarrow")
        # the sort-shuffle emits one output partition per INPUT block,
        # so partitions beyond the n_parts salt values are EMPTY 0-column
        # blocks that poison downstream schema unification ("new schema:
        # ." warnings). repartition() concat-merges them away — the
        # output is O(distinct keys) rows, so this pass is cheap.
        .repartition(n_parts)
    )


def _pagerank_distributed(pages_dir: str, n: int, iters: int = PR_ITERS,
                          seed_fn=None, out_col: str = "pagerank"):
    """PageRank as iterative join + groupby dataflow — the same
    per-round shape as the label-propagation connected components: each
    round joins the edge list to the current rank vector on src (hash
    join), emits per-edge contributions r/outdeg, and groupby(dst)-sums
    them. Zero-in-link nodes are kept alive by a ghost 0-weight row per
    node (a union, not a driver fixup), so no left-outer join is needed.
    Partitioning: edges shuffle on src (join) then dst (sum); ranks are
    O(nodes) rows per round, materialized to cut lineage growth.

    ``seed_fn`` generalizes to PERSONALIZED PageRank (TrustRank): the
    teleport mass goes only to urls where seed_fn(url) is true. The
    seed indicator is a pure function of the url string, so each round
    recomputes it in-batch — no seed-table join. seed_fn=None keeps the
    uniform teleport (bit-identical to the original recurrence)."""
    edges_raw = _outlinks_ds(pages_dir)
    outdeg = edges_raw.groupby("src").aggregate(
        ray.data.aggregate.Count(alias_name="od")
    )
    nparts = dd.adaptive_partitions(n * 4)
    edges = edges_raw.join(
        outdeg, join_type="inner", num_partitions=nparts,
        on=("src",),
    ).materialize()
    nodes = rd.read_parquet(pages_dir, columns=["url"])
    if seed_fn is None:
        ns = n
        _is_seed = None
    else:
        _is_seed = seed_fn
        ns = int(
            nodes.map_batches(
                lambda t: pa.table(
                    {"c": pa.array(
                        [sum(1 for u in t["url"].to_pylist()
                             if seed_fn(u))], pa.int64())}
                ),
                batch_format="pyarrow", zero_copy_batch=True,
            ).sum("c")
        )
    r0 = PR_SCALE // ns
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ns)

    def init_ranks(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        r = [r0 if (_is_seed is None or _is_seed(u)) else 0 for u in urls]
        return pa.table(
            {"url": t["url"], "r": pa.array(r, pa.int64())}
        )

    ranks = nodes.map_batches(
        init_ranks, batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    ghost = nodes.map_batches(
        lambda t: pa.table(
            {"dst": t["url"],
             "w": pa.array([0] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    def contrib(t: pa.Table) -> pa.Table:
        # int64 // int64: nonnegative, so Arrow's truncation == floor
        w = pc.divide(t["r"], pc.cast(t["od"], pa.int64()))
        # per-batch combiner: integer sums are exactly associative, so
        # pre-summing by dst inside the batch cuts the groupby shuffle
        # from O(edges) to O(distinct dsts per batch) rows
        part = pa.table({"dst": t["dst"], "w": w}).group_by("dst").aggregate(
            [("w", "sum")]
        )
        return pa.table(
            {"dst": part["dst"], "w": pc.cast(part["w_sum"], pa.int64())}
        )

    def renorm(t: pa.Table) -> pa.Table:
        prop = pc.divide(
            pc.multiply(
                pa.scalar(PR_DAMP_NUM, pa.int64()),
                pc.cast(t["w_sum"], pa.int64()),
            ),
            pa.scalar(PR_DAMP_DEN, pa.int64()),
        )
        if _is_seed is None:
            b = pa.scalar(base, pa.int64())
        else:
            b = pa.array(
                [base if _is_seed(u) else 0
                 for u in t["dst"].to_pylist()],
                pa.int64(),
            )
        return pa.table({"url": t["dst"], "r": pc.add(b, prop)})

    for _ in range(iters):
        contribs = (
            edges.join(ranks, join_type="inner",
                       num_partitions=nparts,
                       on=("src",), right_on=("url",))
            .map_batches(contrib, batch_format="pyarrow",
                         zero_copy_batch=True)
            .union(ghost)
        )
        # salted Arrow C++ group_by: Dataset.groupby().aggregate(Sum)
        # combines at Python speed and dominated each round (~8s of a
        # ~17s round at 190k edges); integer sums are exactly
        # associative, so the fast path is value-identical
        sums = _grouped_sum_str(contribs, "dst", "w", "w_sum", nparts)
        ranks = sums.map_batches(
            renorm, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table(
            {
                "url": t["url"],
                # exact int -> one IEEE division: bit-identical everywhere
                out_col: pc.divide(
                    pc.cast(t["r"], pa.float64()),
                    pa.scalar(float(PR_SCALE)),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _pagerank_driver(pages_dir: str, n: int, iters: int = PR_ITERS,
                     seed_fn=None, out_col: str = "pagerank"):
    """Small-graph route: edge list fits the driver (<= 1M edges), so
    the 5 rounds run as in-process dict arithmetic instead of paying 2
    shuffles of actor spinup per round. Bit-identical to the distributed
    route BY CONSTRUCTION: the same integer fixed-point recurrence
    (floor divisions + exact integer sums) — no float path at all until
    the single final division (equivalence pytest-pinned). ``seed_fn``
    restricts the teleport mass to seed urls (TrustRank)."""
    edges = _outlinks_ds(pages_dir)
    od: dict[str, int] = {}
    pairs: list[tuple[str, str]] = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        for a, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            od[a] = od.get(a, 0) + 1
            pairs.append((a, d))
    nodes = [
        u
        for b in rd.read_parquet(pages_dir, columns=["url"]).iter_batches(
            batch_format="pyarrow"
        )
        for u in b["url"].to_pylist()
    ]
    seed = {u: (seed_fn is None or seed_fn(u)) for u in nodes}
    ns = sum(seed.values())
    r = {u: (PR_SCALE // ns if seed[u] else 0) for u in nodes}
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ns)
    for _ in range(iters):
        s = {u: 0 for u in nodes}
        for a, d in pairs:
            s[d] += r[a] // od[a]
        r = {
            u: (base if seed[u] else 0)
            + (PR_DAMP_NUM * s[u]) // PR_DAMP_DEN
            for u in nodes
        }
    return pa.table(
        {
            "url": pa.array(nodes, pa.string()),
            out_col: pa.array(
                [r[u] / float(PR_SCALE) for u in nodes], pa.float64()
            ),
        }
    )


def q_pagerank(sf_dir: str):
    """PageRank (damping 85/100, 5 synchronous iterations), size-routed
    like the fit wave / lm_score: graphs whose edge list exceeds
    PR_DRIVER_EDGE_LIMIT run the distributed join+groupby rounds
    (``_pagerank_distributed`` — the 10^12-edge shape); smaller graphs
    iterate on the driver with the SAME integer fixed-point arithmetic
    (see PR_SCALE above), so driver / distributed / SQL oracle are
    bit-identical. Assumes no dangling nodes (every fixture page has
    outlinks — write_link_corpus guarantees it)."""
    pages_dir = link_corpus()
    # page count from parquet metadata; edges/page is bounded (<=6) in
    # the fixture, so route on pages — a real corpus would route on a
    # metadata edge estimate the same way
    if LINK_N * 6 <= PR_DRIVER_EDGE_LIMIT:
        return _pagerank_driver(pages_dir, LINK_N)
    return _pagerank_distributed(pages_dir, LINK_N)


TRUST_MOD = 7  # page-number % 7 == 0 -> trusted seed (deterministic)
_TRUST_PAGE_RE = re.compile(r"p(\d+)$")


def _trust_seed(url: str) -> bool:
    m = _TRUST_PAGE_RE.search(url)
    return bool(m) and int(m.group(1)) % TRUST_MOD == 0


def q_trustrank(sf_dir: str):
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): the
    link-spam demotion pass of a web-corpus curation pipeline —
    PageRank with the teleport mass restricted to a trusted seed set,
    so trust flows outward from seeds and isolated spam farms starve.
    Seeds here are the deterministic page-number % TRUST_MOD urls (a
    real run plugs in a human-audited list). Same integer fixed-point
    recurrence and size-routing as q_pagerank (driver / distributed /
    SQL oracle bit-identical); the seed indicator is a pure function of
    the url, so the distributed route recomputes it in-batch instead of
    joining a seed table."""
    pages_dir = link_corpus()
    if LINK_N * 6 <= PR_DRIVER_EDGE_LIMIT:
        return _pagerank_driver(
            pages_dir, LINK_N, seed_fn=_trust_seed, out_col="trustrank"
        )
    return _pagerank_distributed(
        pages_dir, LINK_N, seed_fn=_trust_seed, out_col="trustrank"
    )


def trustrank_oracle_sql(pages_dir: str, n: int = LINK_N) -> str:
    """Unrolled replay of q_trustrank: q_pagerank's oracle with the
    teleport terms gated on the seed indicator (page-number regexp) and
    normalized by the seed COUNT instead of n."""
    ns = len(range(0, n, TRUST_MOD))
    r0 = PR_SCALE // ns
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ns)
    iters = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
r{k} as (
  select p.url,
         case when p.s = 1 then {base} else 0 end
           + ({PR_DAMP_NUM} * coalesce(sm.s, 0)) // {PR_DAMP_DEN} as r
  from seeds p left join (
    select e.dst as url, sum(rp.r // e.od)::bigint as s
    from edges e join {prev} rp on e.src = rp.url
    group by e.dst) sm using (url))""")
        prev = f"r{k}"
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
links as ({outlinks_oracle_sql(pages_dir)}),
outdeg as (select src, count(*)::bigint as od from links group by src),
edges as (select l.src, l.dst, o.od from links l join outdeg o using (src)),
pages as (select url from pages_raw),
seeds as (
  select url,
         case when regexp_extract(url, 'p(\\d+)$', 1)::int
                   % {TRUST_MOD} = 0
              then 1 else 0 end as s
  from pages),
r0 as (select url, case when s = 1 then {r0}::bigint else 0::bigint end
         as r from seeds),{",".join(iters)}
select url, r / {PR_SCALE}.0 as trustrank from {prev}
"""


def q_char_entropy(sf_dir: str):
    """Shannon entropy of the character distribution per document — the
    keyboard-mash / wrong-encoding / binary-spill quality signal
    (near-zero entropy = one repeated char; English text ~4.1 bits).
    Embarrassingly parallel; numpy-vectorized per row over the byte
    counts. Empty docs are dropped (the oracle's length>0 gate). Rounded
    to 6 dp: libm log2 last-ulp differences between numpy and DuckDB are
    ~1e-16 per term, far below the rounding grain."""
    import collections

    def f(t: pa.Table) -> pa.Table:
        ids_out, n_out, e_out = [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if not s:
                continue
            counts = np.fromiter(
                collections.Counter(s).values(), dtype=np.float64
            )
            p = counts / counts.sum()
            ent = float(-(p * np.log2(p)).sum())
            ids_out.append(did)
            n_out.append(len(counts))
            e_out.append(round(ent, 6))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_distinct_chars": pa.array(n_out, pa.int64()),
                "char_entropy": pa.array(e_out, pa.float64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_reciprocal_links(sf_dir: str):
    """Reciprocal-link detection over the link graph — the classic
    link-farm / spam signal (A->B and B->A). Distinct directed edges,
    then a self-join of the canonically-ordered halves: edges with
    src<dst join edges with src>dst reversed, so each reciprocal pair
    surfaces exactly once as (a, b), a < b. Self-loops are excluded.
    Shuffle keys: the pair itself — never the corpus."""
    edges = _outlinks_ds(link_corpus())

    def canon(t: pa.Table) -> pa.Table:
        lt = pc.less(t["src"], t["dst"])
        fwd = t.filter(lt)
        rev = t.filter(pc.greater(t["src"], t["dst"]))
        return pa.table(
            {
                "a": pa.concat_arrays(
                    [fwd["src"].combine_chunks(),
                     rev["dst"].combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [fwd["dst"].combine_chunks(),
                     rev["src"].combine_chunks()]
                ),
                "dir": pa.concat_arrays(
                    [pa.array(["f"] * len(fwd), pa.string()),
                     pa.array(["r"] * len(rev), pa.string())]
                ),
            }
        )

    halves = edges.map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )
    # a pair is reciprocal iff BOTH directions appear; duplicate hrefs
    # make raw counts unreliable, so test distinct directions instead:
    # min(dir) != max(dir) <=> {'f','r'} both present
    dirs = halves.groupby(["a", "b"]).aggregate(
        ray.data.aggregate.Min("dir", alias_name="dmin"),
        ray.data.aggregate.Max("dir", alias_name="dmax"),
    )
    return dirs.filter(expr="dmin != dmax").select_columns(["a", "b"])


# k-core: keep peeling nodes of degree < K until fixpoint. K=7 on the
# fixture graph leaves a non-trivial core (190 of 200 pages, 2 peel
# rounds); the oracle unrolls KCORE_ROUNDS rounds — peeling is monotone,
# so rounds past the fixpoint are no-ops and any unroll >= the true peel
# depth replays the engine exactly (pytest asserts depth < KCORE_ROUNDS).
KCORE_K = 7
KCORE_ROUNDS = 8
KCORE_DRIVER_EDGE_LIMIT = 1_000_000


def _und_edges_ds(pages_dir: str):
    """Distinct undirected simple edges (a < b) of the link multigraph:
    per-batch Arrow group_by collapses duplicates BEFORE the shuffle,
    one groupby dedups globally."""

    def orient(t: pa.Table) -> pa.Table:
        src, dst = t["src"], t["dst"]
        keep = pc.not_equal(src, dst)
        src, dst = src.filter(keep), dst.filter(keep)
        return (
            pa.table(
                {
                    "a": pc.min_element_wise(src, dst),
                    "b": pc.max_element_wise(src, dst),
                }
            )
            .group_by(["a", "b"])
            .aggregate([])
        )

    return (
        _outlinks_ds(pages_dir)
        .map_batches(orient, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(ray.data.aggregate.Count(alias_name="_n"))
        .select_columns(["a", "b"])
    )


def _kcore_peel_batch(t: pa.Table) -> pa.Table:
    """Whole-graph peel in one task (the union-find-task idiom): the
    dedup'd edge list is orders of magnitude smaller than the corpus,
    so at fixture scale it lives in one object-store batch."""
    adj: dict[str, set[str]] = {}
    for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {u for u in alive
                if sum(1 for v in adj[u] if v in alive) < KCORE_K}
        if not drop:
            break
        alive -= drop
    urls = sorted(alive)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "degree": pa.array(
                [sum(1 for v in adj[u] if v in alive) for u in urls],
                pa.int64(),
            ),
        }
    )


def _kcore_distributed(und, nparts: int):
    """Iterative distributed peel: per round one groupby-count (degree)
    and two hash semi-joins (drop edges touching a dead endpoint). The
    label table is O(alive nodes) and each round's edge set shrinks
    monotonically; rounds are bounded by the peel depth (the graph's
    degeneracy ordering length), small on web graphs. Each round
    materializes the shrunken edge set so iteration doesn't replay
    prior rounds' lineage (the connected_components pattern,
    stages/dedup.py)."""
    sym = und.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_nodes = None
    for _ in range(KCORE_ROUNDS):
        deg = sym.groupby("u").aggregate(
            ray.data.aggregate.Count(alias_name="deg")
        )
        alive = deg.filter(
            expr=f"deg >= {KCORE_K}"
        ).select_columns(["u"]).materialize()
        n_alive = alive.count()
        if n_alive == n_nodes:
            break
        n_nodes = n_alive
        sym = (
            sym.join(alive, join_type="inner", num_partitions=nparts,
                     on=("u",))
            .join(alive.map_batches(
                lambda t: pa.table({"v": t["u"]}),
                batch_format="pyarrow"),
                join_type="inner", num_partitions=nparts, on=("v",))
            .materialize()
        )
    return sym.groupby("u").aggregate(
        ray.data.aggregate.Count(alias_name="degree")
    ).map_batches(
        lambda t: pa.table(
            {"url": t["u"], "degree": pc.cast(t["degree"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def q_link_kcore(sf_dir: str):
    """K-core of the undirected simple link graph (K=7): the classic
    dense-subgraph gate — link farms and genuine navigational cores
    survive, sparsely-linked leaf pages peel away. Size-routed like
    q_pagerank: small graphs peel in ONE task over the dedup'd edge
    list (the union-find-task idiom); beyond KCORE_DRIVER_EDGE_LIMIT
    the iterative distributed peel runs (round = groupby-count + two
    semi-joins over a monotonically shrinking edge set). Both routes
    emit (url, degree-within-core) and are equivalence-tested."""
    pages_dir = link_corpus()
    und = _und_edges_ds(pages_dir)
    if LINK_N * 6 <= KCORE_DRIVER_EDGE_LIMIT:
        n = und.materialize().count()
        return und.repartition(1).map_batches(
            _kcore_peel_batch, batch_format="pyarrow",
            batch_size=max(2 * n, 1),
        )
    return _kcore_distributed(und, dd.adaptive_partitions(LINK_N))


def kcore_oracle_sql(pages_dir: str) -> str:
    """Unrolled replay of the peel: s_{k+1} keeps edges whose BOTH
    endpoints have degree >= K in s_k; KCORE_ROUNDS rounds, no-ops
    after the fixpoint. Every round CTE is MATERIALIZED — each
    references the previous one twice, so DuckDB's default inline
    expansion re-evaluates the chain exponentially (3^rounds)."""
    rounds = []
    prev = "s0"
    for k in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""
a{k} as materialized (
  select u from {prev} group by u having count(*) >= {KCORE_K}),
s{k} as materialized (
  select s.u, s.v from {prev} s
  join a{k} x on s.u = x.u join a{k} y on s.v = y.u)""")
        prev = f"s{k}"
    return f"""
with links as ({outlinks_oracle_sql(pages_dir)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from links where src <> dst),
s0 as (select a as u, b as v from und
       union all select b as u, a as v from und),{",".join(rounds)}
select u as url, count(*)::bigint as degree from {prev} group by u
"""


# multi-source BFS from the trust seed set (page-number % TRUST_MOD),
# capped at LINKDIST_MAX hops: "how many clicks from a trusted page" —
# the crawl-depth / spam-distance signal TrustRank thresholds harden.
LINKDIST_MAX = 6
LINKDIST_DRIVER_EDGE_LIMIT = 1_000_000


def _dir_edges_ds(pages_dir: str):
    """Distinct directed simple edges of the link graph."""

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["src"], t["dst"])
        return (
            pa.table({"src": t["src"].filter(keep),
                      "dst": t["dst"].filter(keep)})
            .group_by(["src", "dst"])
            .aggregate([])
        )

    return (
        _outlinks_ds(pages_dir)
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(ray.data.aggregate.Count(alias_name="_n"))
        .select_columns(["src", "dst"])
    )


def _linkdist_bfs_batch(t: pa.Table) -> pa.Table:
    """Whole-graph BFS in one task (small route). Seeds are a pure
    function of the url (the TrustRank indicator), so no seed table
    ships — recomputed in-task, exactly like _pagerank_distributed's
    in-batch seed recompute."""
    out: dict[str, set[str]] = {}
    nodes: set[str] = set()
    for s, d in zip(t["src"].to_pylist(), t["dst"].to_pylist()):
        out.setdefault(s, set()).add(d)
        nodes.add(s)
        nodes.add(d)
    dist = {u: 0 for u in nodes if _trust_seed(u)}
    frontier = set(dist)
    for k in range(1, LINKDIST_MAX + 1):
        nxt: set[str] = set()
        for u in frontier:
            nxt |= out.get(u, set())
        frontier = {v for v in nxt if v not in dist}
        if not frontier:
            break
        for v in frontier:
            dist[v] = k
    urls = sorted(dist)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "dist": pa.array([dist[u] for u in urls], pa.int64()),
        }
    )


def _linkdist_distributed(edges, pages, nparts: int):
    """Pruned frontier BFS: per round one hash join (frontier -> next
    hop), one distinct, one left_anti against the visited set. The
    frontier and visited tables are O(nodes) — tiny vs the corpus —
    and every join is keyed on src, the same partitioning key each
    round. Identical output to the walk-expansion oracle because a
    node at distance d first appears at level d either way."""

    def seed(t: pa.Table) -> pa.Table:
        keep = [u for u in t["url"].to_pylist() if _trust_seed(u)]
        return pa.table(
            {
                "url": pa.array(keep, pa.string()),
                "dist": pa.array([0] * len(keep), pa.int64()),
            }
        )

    known = pages.map_batches(
        seed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    frontier = known.select_columns(["url"]).materialize()
    for k in range(1, LINKDIST_MAX + 1):
        hop = (
            edges.join(frontier, join_type="inner",
                       num_partitions=nparts, on=("src",),
                       right_on=("url",))
            .select_columns(["dst"])
            .groupby("dst")
            .aggregate(ray.data.aggregate.Count(alias_name="_n"))
            .select_columns(["dst"])
        )
        new = hop.join(
            known.select_columns(["url"]), join_type="left_anti",
            num_partitions=nparts, on=("dst",), right_on=("url",),
        ).map_batches(
            lambda t, _k=k: pa.table(
                {
                    "url": t["dst"],
                    "dist": pa.array([_k] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if new.count() == 0:
            break
        known = known.union(new).materialize()
        frontier = new.select_columns(["url"]).materialize()
    return known


def q_link_distance(sf_dir: str):
    """Hop distance from the trusted seed set over directed links,
    capped at LINKDIST_MAX — the crawl-scheduling / spam-demotion
    companion to q_trustrank (pages many clicks from any trusted hub
    are crawl-frontier losers). Size-routed: one-task BFS under
    LINKDIST_DRIVER_EDGE_LIMIT edges, else pruned distributed frontier
    BFS (join + distinct + left_anti per round, frontier tables
    O(nodes)). Routes are equivalence-tested."""
    pages_dir = link_corpus()
    edges = _dir_edges_ds(pages_dir)
    if LINK_N * 6 <= LINKDIST_DRIVER_EDGE_LIMIT:
        n = edges.materialize().count()
        return edges.repartition(1).map_batches(
            _linkdist_bfs_batch, batch_format="pyarrow",
            batch_size=max(2 * n, 1),
        )
    pages = rd.read_parquet(pages_dir, columns=["url"])
    return _linkdist_distributed(
        edges, pages, dd.adaptive_partitions(LINK_N)
    )


def linkdist_oracle_sql(pages_dir: str, n: int = LINK_N) -> str:
    """Walk-expansion replay: f_k = nodes reachable in exactly k steps
    (distinct per level); min level per node = BFS distance. Equivalent
    to the engine's pruned BFS because a node at distance d first
    appears at level d in both formulations. Level CTEs MATERIALIZED
    (each is referenced by the next level AND the final union — inline
    expansion would re-walk the whole chain per reference)."""
    levels = []
    union = ["select url, 0 as d from f0"]
    prev = "f0"
    for k in range(1, LINKDIST_MAX + 1):
        levels.append(f"""
f{k} as materialized (select distinct e.dst as url from e
         join {prev} on e.src = {prev}.url)""")
        union.append(f"select url, {k} as d from f{k}")
        prev = f"f{k}"
    return f"""
with links as ({outlinks_oracle_sql(pages_dir)}),
e as (select distinct src, dst from links where src <> dst),
pages as (select url from ({_link_pages_sql(pages_dir)})),
f0 as (select url from pages
       where regexp_extract(url, 'p(\\d+)$', 1)::int
             % {TRUST_MOD} = 0),{",".join(levels)},
lv as ({" union all ".join(union)})
select url, min(d)::bigint as dist from lv group by url
"""


LINK_ANCHOR_RE = re.compile(r'<a href="([^"]*)">([^<]*)</a>')


def q_anchor_text(sf_dir: str):
    """Anchor-text aggregation per target url — the classic web-corpus
    signal (anchor words pointing AT a page describe it better than the
    page itself; used for retrieval labels and spam detection). Shape:
    parse (dst, anchor) pairs from raw HTML, per-batch Arrow combiner
    collapses duplicate pairs BEFORE the shuffle, one groupby on the
    (dst, anchor) pair, then a per-dst rollup whose group size is the
    number of DISTINCT anchors of a page — bounded even for a hub with
    10^9 in-links, because the duplicate mass was pre-summed."""

    def pairs(t: pa.Table) -> pa.Table:
        dsts: list[str] = []
        anchors: list[str] = []
        for h in t["html"].to_pylist():
            for m in LINK_ANCHOR_RE.finditer(h.decode("utf-8")):
                dsts.append(m.group(1))
                anchors.append(m.group(2))
        part = (
            pa.table(
                {
                    "dst": pa.array(dsts, pa.string()),
                    "anchor": pa.array(anchors, pa.string()),
                }
            )
            .group_by(["dst", "anchor"])
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["dst", "anchor", "n"])

    def rollup(g: pa.Table) -> pa.Table:
        n = pc.sum(g["n"]).as_py() or 0
        return pa.table(
            {
                "url": pa.array([g["dst"][0].as_py()], pa.string()),
                "n_anchors": pa.array([int(n)], pa.int64()),
                "n_distinct_anchors": pa.array(
                    [g.num_rows], pa.int64()
                ),
                "top_anchor": pa.array(
                    [pc.min(g["anchor"]).as_py()], pa.string()
                ),
            }
        )

    return (
        rd.read_parquet(link_corpus(), columns=["html"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["dst", "anchor"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .groupby("dst")
        .map_groups(rollup, batch_format="pyarrow")
    )


HTML_TITLE_RE = re.compile(r"<title>([^<]*)</title>")
HTML_FIRST_P_RE = re.compile(r"<p>([^<]*)</p>")


def q_html_meta(sf_dir: str):
    """Page-metadata extraction from raw HTML (title, first-paragraph
    snippet, outlink count) — the head-of-pipeline enrichment every
    Common-Crawl curation run does before quality gating. One
    embarrassingly-parallel pass over the binary column; compiled
    regexes at module scope; no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        titles: list[str | None] = []
        paras: list[str | None] = []
        nlinks: list[int] = []
        for h in t["html"].to_pylist():
            s = h.decode("utf-8")
            # "" -> null on both sides: DuckDB regexp_extract returns
            # '' for no-match, so the oracle wraps in nullif(.., '')
            m = HTML_TITLE_RE.search(s)
            titles.append((m.group(1) or None) if m else None)
            m = HTML_FIRST_P_RE.search(s)
            paras.append((m.group(1) or None) if m else None)
            nlinks.append(len(LINK_HREF_RE.findall(s)))
        return pa.table(
            {
                "url": t["url"],
                "title": pa.array(titles, pa.string()),
                "first_para": pa.array(paras, pa.string()),
                "n_links": pa.array(nlinks, pa.int64()),
            }
        )

    return rd.read_parquet(
        link_corpus(), columns=["url", "html"]
    ).map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def recrawl_corpus() -> str:
    """Lazily write the deterministic re-crawl corpus (sf-independent
    fixed path); both the Ray query and the oracle composer call this,
    so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_recrawl_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_recrawl_150")
    return write_recrawl_corpus(root, n_urls=150, seed=1)


def q_temporal_novelty(sf_dir: str):
    """Per-snapshot content novelty over the re-crawl corpus: a
    3-token shingle is NOVEL in the snapshot where it first appears
    (global min warc_ts — unique per capture in this corpus, asserted
    by the fixture), and each capture reports its distinct-shingle
    count, novel count and integer novelty_ppm — the crawl-scheduling
    signal (a site whose captures stop producing novel shingles gets
    demoted). One pass explodes distinct md5-hashed shingles (8-byte
    shuffle keys, never the strings), groupby(shingle) Min finds the
    owner capture, a count-by-owner and a tiny hash join on the capture
    timestamp attach novel counts to per-capture totals. Shuffles scale
    with distinct shingles, not corpus bytes."""
    pages = rd.read_parquet(
        recrawl_corpus(), columns=["url", "warc_ts", "text"]
    )

    def totals(t: pa.Table) -> pa.Table:
        n = [
            len(set(dd._shingles(txt)))
            for txt in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "url": t["url"],
                "us": pc.cast(t["warc_ts"], pa.int64()),
                "n_shingles": pa.array(n, pa.int64()),
            }
        )

    def explode(t: pa.Table) -> pa.Table:
        us = pc.cast(t["warc_ts"], pa.int64()).to_pylist()
        hs, uss = [], []
        for txt, u in zip(t["text"].to_pylist(), us):
            for s in set(dd._shingles(txt)):
                hs.append(dd._hash64(s) - 2 ** 63)
                uss.append(u)
        return pa.table(
            {
                "sh": pa.array(hs, pa.int64()),
                "us": pa.array(uss, pa.int64()),
            }
        )

    tot = pages.map_batches(totals, batch_format="pyarrow",
                            zero_copy_batch=True)
    n_parts = dd.adaptive_partitions(450)  # captures in the fixture
    nov = (
        pages.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("sh")
        .aggregate(ray.data.aggregate.Min("us", alias_name="us"))
        .map_batches(
            lambda t: pa.table(
                {"us": t["us"],
                 "one": pa.array([1] * len(t), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("us")
        .aggregate(ray.data.aggregate.Sum("one", alias_name="n_novel"))
    )
    joined = tot.join(nov, join_type="left_outer", on=("us",),
                      num_partitions=n_parts)

    def finish(t: pa.Table) -> pa.Table:
        ns = np.asarray(t["n_shingles"].to_pylist(), dtype=np.int64)
        nv = np.asarray(
            [0 if v is None else v for v in t["n_novel"].to_pylist()],
            dtype=np.int64,
        )
        ppm = np.where(ns > 0, (nv * 10 ** 6) // np.maximum(ns, 1), 0)
        return pa.table(
            {
                "url": t["url"],
                "ts_us": t["us"],
                "n_shingles": pa.array(ns, pa.int64()),
                "n_novel": pa.array(nv, pa.int64()),
                "novelty_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def temporal_novelty_oracle_sql(pages_dir: str) -> str:
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with p as (select url, epoch_us(warc_ts) as us, text
           from read_parquet('{pages_dir}/*.parquet')),
toks as (select url, us, {tokenize} as toks from p),
sh as (
  select url, us,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
sd as (select url, us, list_distinct(shingles) as s from sh),
fl as (select us,
              (('0x' || substr(md5(unnest(s)), 1, 16))::ubigint::hugeint
               - 9223372036854775808)::bigint as h
       from sd),
own as (select h, min(us) as us from fl group by h),
nov as (select us, count(*)::bigint as n_novel from own group by us),
tot as (select url, us, len(s)::bigint as n_shingles from sd)
select t.url, t.us as ts_us, t.n_shingles,
       coalesce(nov.n_novel, 0)::bigint as n_novel,
       case when t.n_shingles > 0
            then (coalesce(nov.n_novel, 0) * 1000000) // t.n_shingles
            else 0 end::bigint as novelty_ppm
from tot t left join nov using (us)
"""


def q_snapshot_latest(sf_dir: str):
    """Re-crawl snapshot dedup: the same url appears in many WARC
    segments; keep only the FRESHEST capture (max warc_ts) plus the
    snapshot count. One groupby(url) whose group is a url's revision
    history — bounded by crawl frequency (tens), never corpus-sized,
    so map_groups is safe at 10^12 pages. The fixture guarantees
    per-url-unique timestamps, so "latest" is unambiguous; real WARC
    data should tie-break on a digest column (documented here)."""

    def latest(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("warc_ts", "descending")]
        )
        top = g.take(idx.slice(0, 1))
        return pa.table(
            {
                "url": top["url"],
                "warc_ts": top["warc_ts"],
                "n_snapshots": pa.array([g.num_rows], pa.int64()),
                "text": top["text"],
            }
        )

    return (
        rd.read_parquet(
            recrawl_corpus(), columns=["url", "warc_ts", "text"]
        )
        .groupby("url")
        .map_groups(latest, batch_format="pyarrow")
    )


def crawl_diff_corpus() -> tuple[str, str]:
    """Lazily write the deterministic two-crawl fixture (sf-independent
    fixed path); both the Ray query and the oracle composer call this,
    so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_crawl_diff_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_crawldiff_200")
    return write_crawl_diff_corpus(root, n_urls=200, seed=1)


def q_snapshot_diff(sf_dir: str):
    """Crawl-over-crawl diff (the Common-Crawl monthly-snapshot
    comparison): classify every url across two full crawls as
    new / gone / changed / unchanged. Union the two snapshots tagged by
    side, then ONE groupby(url) whose group is at most one row per crawl
    — bounded at 2 rows regardless of corpus size, so map_groups is safe
    at 10^12 urls; the only shuffle is keyed by url (at real scale, by
    its 16-byte md5 with the identical plan shape). Text equality is
    decided inside the group — no full-corpus join materializes."""
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

    def classify(g: pa.Table) -> pa.Table:
        sides = dict(
            zip(g["side"].to_pylist(), g["text"].to_pylist())
        )
        if 0 in sides and 1 in sides:
            status = "unchanged" if sides[0] == sides[1] else "changed"
        elif 0 in sides:
            status = "gone"
        else:
            status = "new"
        return pa.table(
            {
                "url": g["url"].slice(0, 1),
                "status": pa.array([status], pa.string()),
            }
        )

    return (
        a.union(b).groupby("url").map_groups(classify, batch_format="pyarrow")
    )


def snapshot_diff_oracle_sql(a_dir: str, b_dir: str) -> str:
    return f"""
select coalesce(a.url, b.url) as url,
       case when a.url is null then 'new'
            when b.url is null then 'gone'
            when a.text = b.text then 'unchanged'
            else 'changed' end as status
from read_parquet('{a_dir}/*.parquet') a
full outer join read_parquet('{b_dir}/*.parquet') b on a.url = b.url
"""


DOMAIN_REP_MIN_STOP = 0.08  # pooled stopword density below this = low-rep


def q_domain_reputation(sf_dir: str):
    """Domain-reputation filter (the UT1/RefinedWeb idea that quality is
    a property of the SITE, not just the page): pool per-doc stopword /
    token counts into one per-domain density — sums, not mean-of-means,
    so the score is exact and order-free — then hash-join the verdict
    back onto every page of the domain. Two shuffles total: a tiny
    groupby(source) of integer partials and the docs ⋈ domains join
    (broadcastable when the domain table fits; the join route shown here
    is the 10^8-domain shape)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partials(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_tok = pc.cast(
            pc.count_substring_regex(text, pattern=tx.TOKEN_PATTERN),
            pa.int64(),
        )
        n_stop = None
        for w in tx.STOPWORDS:
            c = pc.count_substring_regex(text, pattern=rf"\b{w}\b")
            n_stop = c if n_stop is None else pc.add(n_stop, c)
        return pa.table(
            {
                "source": t["source"],
                "stop": pc.cast(n_stop, pa.int64()),
                "tok": n_tok,
            }
        )

    domains = (
        docs.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("stop", alias_name="stop_sum"),
            ray.data.aggregate.Sum("tok", alias_name="tok_sum"),
        )
    )

    def score(t: pa.Table) -> pa.Table:
        dens = pc.round(
            pc.divide(
                pc.cast(t["stop_sum"], pa.float64()),
                pc.cast(
                    pc.max_element_wise(
                        t["tok_sum"], pa.scalar(1, pa.int64())
                    ),
                    pa.float64(),
                ),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "source": t["source"],
                "domain_score": dens,
                "keep": pc.greater_equal(
                    dens, pa.scalar(DOMAIN_REP_MIN_STOP)
                ),
            }
        )

    verdict = domains.map_batches(score, batch_format="pyarrow")
    return docs.select_columns(["doc_id", "source"]).join(
        verdict,
        join_type="inner",
        num_partitions=dd.adaptive_partitions(
            _table_rows(sf_dir, "documents")
        ),
        on=("source",),
    )


BAD_URL_WORDS = ["casino", "xxx", "pills", "torrent"]


def _filter_url(doc_id: int) -> str:
    """Deterministic fixture URL with blocklist words injected on fixed
    residues (host on %23, path on %19, query on %29) so every rule has
    positive and negative rows; the oracle rebuilds it with CASE."""
    host = ("adult-xxx-" if doc_id % 23 == 0 else "") + f"site{doc_id % 13}"
    path = ("casino/" if doc_id % 19 == 0 else "") + f"page{doc_id}"
    q = "?promo=cheap-pills-online" if doc_id % 29 == 0 else ""
    return f"https://{host}.example/{path}{q}"


def q_url_filter(sf_dir: str):
    """URL keyword blocklist (the RefinedWeb/UT1 URL-filtering stage):
    score each page's url by how many blocklist words it contains
    (vectorized ``match_substring`` per word — RE2-free substring scan)
    and flag pages for removal. Embarrassingly parallel, no shuffle;
    the word list ships once per task as a closure constant."""
    docs = _read(sf_dir, "documents", ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        urls = pa.array(
            [_filter_url(i) for i in t["doc_id"].to_pylist()], pa.string()
        )
        n_bad = None
        for w in BAD_URL_WORDS:
            c = pc.cast(pc.match_substring(urls, w), pa.int64())
            n_bad = c if n_bad is None else pc.add(n_bad, c)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": urls,
                "n_bad": n_bad,
                "keep": pc.equal(n_bad, pa.scalar(0, pa.int64())),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


LANG_WORDS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}
LANG_MIN_DENSITY_PCT = 5  # greatest hit count must be >= 5% of tokens


def q_lang_id_multi(sf_dir: str):
    """Multi-language n-gram/stopword language ID (the CCNet fastText
    analog at heuristic scale): derive pages with language-marker words
    injected by ``doc_id % 4`` and ``1 + doc_id % 3`` repetitions, count
    each language's marker words with vectorized RE2 kernels, and pick
    the argmax with a fixed preference order (en>de>fr>es) — integer
    cross-multiplied density gate (count*100 >= PCT*tokens), no float
    threshold. Stateless single pass, no shuffle."""
    langs = list(LANG_WORDS)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        pages = [
            (txt or "")
            + (" " + " ".join(LANG_WORDS[langs[i % 4]])) * (1 + i % 3)
            for i, txt in zip(ids, t["text"].to_pylist())
        ]
        arr = pa.array(pages, pa.string())
        n_tok = pc.cast(
            pc.count_substring_regex(arr, pattern=tx.TOKEN_PATTERN),
            pa.int64(),
        )
        counts = {}
        for lang, words in LANG_WORDS.items():
            c = None
            for w in words:
                k = pc.count_substring_regex(arr, pattern=rf"\b{w}\b")
                c = k if c is None else pc.add(c, k)
            counts[lang] = pc.cast(c, pa.int64()).to_numpy()
        C = np.stack([counts[lg] for lg in langs])  # (4, n)
        best = np.argmax(C, axis=0)  # first max wins = preference order
        best_count = C[best, np.arange(C.shape[1])]
        toks = n_tok.to_numpy()
        pred = np.where(
            best_count * 100 >= LANG_MIN_DENSITY_PCT * np.maximum(toks, 1),
            np.array(langs)[best],
            "und",
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n_tok,
                "pred_lang": pa.array(pred.tolist(), pa.string()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_snapshot_incremental(sf_dir: str):
    """Incremental re-processing set (the crawl-over-crawl follow-on to
    `snapshot_diff`): only urls that are NEW or CHANGED in crawl B need
    to re-enter the extraction/curation pipeline — unchanged and gone
    pages are skipped entirely. The diff's (url, status) rows hash-join
    back to crawl B's pages; both shuffles are keyed by url, so at scale
    the diff groupby and this join share one partitioning."""
    _, b_dir = crawl_diff_corpus()

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(
                t["status"], value_set=pa.array(["new", "changed"])
            )
        )

    todo = q_snapshot_diff(sf_dir).map_batches(
        keep, batch_format="pyarrow"
    )
    b = rd.read_parquet(b_dir, columns=["url", "text"])
    return todo.join(
        b,
        join_type="inner",
        num_partitions=dd.adaptive_partitions(200),
        on=("url",),
    )


PHASH_BITS = 60  # 4 bands x 15 bits (fits a signed bigint on both sides)
PHASH_BANDS = 4
PHASH_HAM_T = 6  # pairs at/below this Hamming distance are near-dups
PHASH_BUCKET_CAP = 10_000  # skew guard: cap candidates from one bucket


def _phash(doc_id: int) -> int:
    """Deterministic 60-bit perceptual-hash stand-in: docs in the same
    group of 5 share an md5-derived base pattern and differ only by 1-2
    noise bits — the similar-image-small-Hamming-distance structure a
    real pHash produces. In a real pipeline this value comes from the
    media-decode actor stage (stages/media.py); the arithmetic here IS
    the honest stub boundary, replayed bit-exactly by the SQL oracle."""
    base = int(hashlib.md5(f"g{doc_id // 5}".encode()).hexdigest()[:15], 16)
    noise = 0
    if doc_id % 5 != 0:
        noise |= 1 << ((doc_id * 7) % PHASH_BITS)
    if doc_id % 5 >= 3:
        noise |= 1 << ((doc_id * 13) % PHASH_BITS)
    return base ^ noise


def q_media_phash_pairs(sf_dir: str):
    """Perceptual-hash near-dup pairs (image dedup via pHash + banded
    LSH): 60-bit hashes band into 4 x 15-bit buckets, candidates share
    at least one exact band, survivors pass a Hamming <= PHASH_HAM_T
    verify. Same plan shape as MinHash-LSH: band groupby -> within-
    bucket pairing (cap-guarded against skew) -> pair-dedup groupby with
    the verify computed from carried hashes — no join back to the
    corpus, and the shuffles move only (band, 8-byte hash) rows. At
    10^12 images the band key is the partitioner; the decode->phash
    stage is the actor pool in stages/media.py."""
    import logging

    def bands(t: pa.Table) -> pa.Table:
        ids, ks, bvs, phs = [], [], [], []
        for did in t["doc_id"].to_pylist():
            ph = _phash(did)
            for k in range(PHASH_BANDS):
                ids.append(did)
                ks.append(k)
                bvs.append((ph >> (15 * k)) & 0x7FFF)
                phs.append(ph)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k": pa.array(ks, pa.int32()),
                "bv": pa.array(bvs, pa.int64()),
                "phash": pa.array(phs, pa.int64()),
            }
        )

    def pair_bucket(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_pylist()
        phs = g["phash"].to_pylist()
        a_out, b_out, pa_out, pb_out = [], [], [], []
        n = len(ids)
        emitted = 0
        for i in range(n):
            for j in range(i + 1, n):
                if emitted >= PHASH_BUCKET_CAP:
                    logging.getLogger(__name__).warning(
                        "media_phash_pairs: bucket capped at %d pairs "
                        "(%d members)", PHASH_BUCKET_CAP, n
                    )
                    break
                x, y = ids[i], ids[j]
                if x > y:
                    x, y = y, x
                    px, py = phs[j], phs[i]
                else:
                    px, py = phs[i], phs[j]
                a_out.append(x)
                b_out.append(y)
                pa_out.append(px)
                pb_out.append(py)
                emitted += 1
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "ph_a": pa.array(pa_out, pa.int64()),
                "ph_b": pa.array(pb_out, pa.int64()),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        ham = int(g["ph_a"][0].as_py() ^ g["ph_b"][0].as_py()).bit_count()
        if ham > PHASH_HAM_T:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "a": g["a"].slice(0, 1),
                "b": g["b"].slice(0, 1),
                "hamming": pa.array([ham], pa.int64()),
            }
        )

    cand = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["k", "bv"])
        .map_groups(pair_bucket, batch_format="pyarrow")
    )
    return cand.groupby(["a", "b"]).map_groups(
        verify, batch_format="pyarrow"
    )


def jsonl_corpus() -> str:
    """Lazily write the deterministic JSONL fixture (the WET/WAT-style
    newline-delimited-JSON source a crawl pipeline ingests alongside
    parquet); idempotent, arithmetic-only."""
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "aper_jsonl_300")
    path = os.path.join(root, "docs.jsonl")
    marker = os.path.join(root, "_manifest.json")
    want = {"kind": "jsonl", "n": 300, "v": 1}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return path
    os.makedirs(root, exist_ok=True)
    with open(path, "w") as f:
        for i in range(300):
            f.write(
                json.dumps(
                    {
                        "url": f"https://j{i % 7}.example/{i}",
                        "lang": ["en", "de", "fr"][i % 3],
                        "score": (i * 3) % 11,
                        "text": f"json doc {i} body words here",
                    }
                )
                + "\n"
            )
    with open(marker, "w") as f:
        json.dump(want, f)
    return path


def q_jsonl_roundtrip(sf_dir: str):
    """Newline-delimited JSON source (WET/WAT-shaped sidecar ingest):
    ``ray.data.read_json`` streams the file in blocks like any other
    source; one vectorized map derives token counts. Shows the non-
    parquet ingestion path end-to-end against a DuckDB read_json_auto
    oracle."""
    ds = rd.read_json(jsonl_corpus())

    def f(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(t["text"], pattern=tx.TOKEN_PATTERN),
            pa.int64(),
        )
        return pa.table(
            {
                "url": t["url"],
                "lang": t["lang"],
                "score": pc.cast(t["score"], pa.int64()),
                "n_tokens": n_tok,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# robots.txt-style per-domain disallow rules: (host-class, path-prefix).
# Deterministic rule synthesis — every host disallows /casino/; every
# third host additionally blocks the /page1 prefix class.
def _robots_rules(host_idx: int) -> list[str]:
    rules = ["/casino/"]
    if host_idx % 3 == 0:
        rules.append("/page1")
    return rules


def q_robots_filter(sf_dir: str):
    """Robots/disallow-rule compliance filter (the crawl-politeness gate
    every fetch pipeline runs BEFORE processing a url): a per-domain
    prefix-rule table — tiny by construction, one entry per (host, rule)
    — is broadcast to a stateless vectorized pass that marks urls whose
    path starts with any disallowed prefix. No shuffle; at 10^8 domains
    the rule table hash-joins on host instead (same output, one extra
    shuffle), which is the documented scale route."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    rules = {
        f"site{k}": _robots_rules(k) for k in range(13)
    }  # hosts come from _filter_url's doc_id % 13 derivation

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        urls, blocked = [], []
        for i in ids:
            u = _filter_url(i)
            host = f"site{i % 13}"
            path = "/" + u.split(".example/", 1)[1]
            urls.append(u)
            blocked.append(
                any(path.startswith(r) for r in rules.get(host, []))
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(urls, pa.string()),
                "blocked": pa.array(blocked, pa.bool_()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


TFIDF_COS_DF_CAP = 50  # terms above this df are too common to pair on
TFIDF_COS_TAU = 0.2  # rounded-cosine threshold for a similar-doc pair


def q_tfidf_cosine_pairs(sf_dir: str):
    """Sparse TF-IDF cosine similar-doc pairs (the inverted-index
    similarity search that complements the dense-embedding family): the
    vector space is the df <= TFIDF_COS_DF_CAP vocabulary (ubiquitous
    terms carry ~no idf and would explode the per-term pairing — the cap
    is the skew guard and is part of the metric's definition, mirrored
    by the oracle); each doc's norm is computed once and CARRIED ON THE
    POSTINGS, so the pipeline is explode -> df groupby -> fused
    score+norm pass -> per-term pairing (group size <= cap) -> pair-sum
    groupby, with no corpus-sized join anywhere. Cosine is rounded to 4
    dp before the threshold so float noise can't flip boundary pairs."""
    import math

    import pyarrow.parquet as pq_

    n_docs = float(
        pq_.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
    )
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        d_out, t_out, c_out = [], [], []
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
    lookup: dict[str, int] = {}
    for b in df.iter_batches(batch_format="pyarrow"):
        lookup.update(zip(b["term"].to_pylist(), b["df"].to_pylist()))
    dref = ray.put(lookup)

    def postings(t: pa.Table) -> pa.Table:
        m = ray.get(dref)
        d_out, t_out, w_out, n_out = [], [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in (s or "").split(" "):
                if w:
                    counts[w] = counts.get(w, 0) + 1
            ws = {
                w: c * math.log(n_docs / m[w])
                for w, c in counts.items()
                if m[w] <= TFIDF_COS_DF_CAP
            }
            if not ws:
                continue
            nrm = math.sqrt(sum(v * v for v in ws.values()))
            for w, v in ws.items():
                if m[w] >= 2:  # df-1 terms can't co-occur
                    d_out.append(did)
                    t_out.append(w)
                    w_out.append(v)
                    n_out.append(nrm)
        return pa.table(
            {
                "doc_id": pa.array(d_out, pa.int64()),
                "term": pa.array(t_out, pa.string()),
                "w": pa.array(w_out, pa.float64()),
                "nrm": pa.array(n_out, pa.float64()),
            }
        )

    def pair_term(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_pylist()
        ws = g["w"].to_pylist()
        ns = g["nrm"].to_pylist()
        a_o, b_o, p_o, na_o, nb_o = [], [], [], [], []
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                a_o.append(ids[i])
                b_o.append(ids[j])
                p_o.append(ws[i] * ws[j])
                na_o.append(ns[i])
                nb_o.append(ns[j])
        return pa.table(
            {
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "p": pa.array(p_o, pa.float64()),
                "na": pa.array(na_o, pa.float64()),
                "nb": pa.array(nb_o, pa.float64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        dot = sum(g["p"].to_pylist())
        cos = round(dot / (g["na"][0].as_py() * g["nb"][0].as_py()), 4)
        if cos < TFIDF_COS_TAU:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "a": g["a"].slice(0, 1),
                "b": g["b"].slice(0, 1),
                "cos": pa.array([cos], pa.float64()),
            }
        )

    post = docs.map_batches(postings, batch_format="pyarrow")
    pairs = post.groupby("term").map_groups(
        pair_term, batch_format="pyarrow"
    )
    return pairs.groupby(["a", "b"]).map_groups(
        finish, batch_format="pyarrow"
    )


QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_length_quantiles(sf_dir: str):
    """Exact corpus-level quantiles of ``n_chars`` via a distributed
    histogram: one groupby(n_chars).count() shuffle produces a table
    bounded by the number of DISTINCT lengths (never corpus-sized), the
    driver cumsums it and picks the value at row ceil(q*N) per quantile.
    Both sides share that explicit formula (the SQL oracle replays it
    with row_number + ceiling on the same IEEE doubles), so the result
    is deterministic and engine-independent — no reliance on any
    engine's quantile interpolation mode."""
    import math

    hist = (
        _read(sf_dir, "documents", ["n_chars"])
        .groupby("n_chars")
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
    )
    rows = sorted(hist.take_all(), key=lambda r: r["n_chars"])
    total = sum(r["n"] for r in rows)
    out_q: list[float] = []
    out_v: list[int] = []
    for q in QUANTILE_QS:
        target = math.ceil(q * total)
        cum = 0
        val = rows[-1]["n_chars"] if rows else 0
        for r in rows:
            cum += r["n"]
            if cum >= target:
                val = r["n_chars"]
                break
        out_q.append(q)
        out_v.append(int(val))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


# docs per (n_chars, id-bucket) rank group — any single group is bounded
# by construction, so a hot length (millions of docs sharing one n_chars
# at web scale) can never overflow a worker
RANK_BUCKET = 65_536


def q_global_rank(sf_dir: str):
    """Global dense ordering rank(doc) = row_number over
    (order by n_chars, doc_id), computed WITHOUT a global sort: count per
    (n_chars, doc_id-bucket) group (one small shuffle; the bucket key
    bounds every group), driver cumsums the bounded group table into base
    offsets (buckets ≪ rows), broadcasts them, and each group enumerates
    its members by doc_id on top of its base. The same decomposition the
    bucketed sessionize/asof trio uses for per-key state at 100 TB."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return t.append_column("bucket", pc.cast(b, pa.int64()))

    with_bucket = docs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        with_bucket.groupby(["n_chars", "bucket"])
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )
    base: dict[tuple[int, int], int] = {}
    cum = 0
    for r in sorted(counts, key=lambda r: (r["n_chars"], r["bucket"])):
        base[(r["n_chars"], r["bucket"])] = cum
        cum += r["n"]
    bref = ray.put(base)

    def rank_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        k = (g["n_chars"][0].as_py(), g["bucket"][0].as_py())
        start = offsets[k]
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_chars": g["n_chars"],
                "rnk": pa.array(
                    range(start + 1, start + 1 + len(g)), pa.int64()
                ),
            }
        )

    return with_bucket.groupby(["n_chars", "bucket"]).map_groups(
        rank_group, batch_format="pyarrow"
    )


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (the class-prototype build of an
    embedding-space pipeline) in long form (label, pos, value): the
    canonical combiner shape — each batch pre-aggregates to one partial
    (label, vector-sum, count) row set with numpy, so the groupby
    shuffles O(labels × read-parallelism) partial rows, never the
    corpus; the final per-label reduce sums a handful of partials.
    ``pos`` is 1-based to match SQL ``generate_subscripts``."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        labels = np.asarray(t["label"].to_pylist())
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.append(int(lab))
            out_s.append(X[m].sum(axis=0).tolist())
            out_n.append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int32()),
                "vsum": pa.array(out_s, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def reduce_group(g: pa.Table) -> pa.Table:
        S = np.asarray(g["vsum"].to_pylist(), dtype=np.float64).sum(axis=0)
        n = int(pc.sum(g["n"]).as_py())
        vals = np.round(S / n, 6)
        lab = g["label"][0].as_py()
        return pa.table(
            {
                "label": pa.array([lab] * len(vals), pa.int32()),
                "pos": pa.array(range(1, len(vals) + 1), pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .map_groups(reduce_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# webtext curation family (round 3): PII redaction, corpus line dedup,
# training-sequence chunking/packing, bigram vocab, quality tiers,
# per-domain accounting
# ---------------------------------------------------------------------------


def _pii_page(doc_id: int, text: str) -> str:
    """Deterministic PII-bearing page derived from a documents row (the
    raw text carries no addresses); the SQL oracle rebuilds it with the
    identical concatenation."""
    return (
        f"{text} contact user{doc_id}@mail{doc_id % 7}.com visit"
        f" http://site{doc_id % 13}.example/p{doc_id} call"
        f" 555-{doc_id % 10000:04d}"
    )


def q_pii_redact(sf_dir: str):
    """PII redaction (webtext publishing hygiene): count + mask URLs,
    emails and phone numbers with three vectorized RE2 kernels per batch
    (``pc.count_substring_regex`` / ``pc.replace_substring_regex``) in a
    fixed order — URL, email, phone — mirrored exactly by nested
    ``regexp_replace(..., 'g')`` in the oracle."""

    def derive(t: pa.Table) -> pa.Table:
        pages = [
            _pii_page(d, txt)
            for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(pages, pa.string())}
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(tx.pii_redact_batch, batch_format="pyarrow")
    )


LINE_MIN_DOCS = 5  # a line repeated across >= this many docs is boilerplate
# broadcast bound for the frequent-line set: a corpus where boilerplate
# variety itself scales (many templates × many sites) must not grow the
# broadcast without limit — over the cap, keep the most-repeated lines
# (the highest-impact boilerplate) and log the dropped volume
LINE_DROP_CAP = 200_000


def q_line_dedup(sf_dir: str):
    """Corpus-level duplicate-line removal (the CCNet / RefinedWeb
    boilerplate pass): pages derived from documents carry a per-source
    header and per-lang footer; pass 1 computes global line doc-frequency
    from per-batch PARTIAL counts keyed by md5 (the shuffle moves
    (hash, count) rows, never line text); the frequent set — bounded by
    construction, it's the boilerplate — is broadcast to a pass-2 actor
    pool that re-derives lines per doc and drops members. No doc text is
    ever shuffled."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    freq = (
        docs.map_batches(
            tx.line_count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("line_md5")
        .sum("nd")
    )

    def keep_frequent(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["sum(nd)"], pa.scalar(LINE_MIN_DOCS, pa.int64()))
        )

    frequent = freq.map_batches(
        keep_frequent, batch_format="pyarrow"
    ).materialize()
    n_frequent = frequent.count()
    if n_frequent > LINE_DROP_CAP:
        # no-silent-caps: keep the most-repeated lines, say what was cut
        import logging

        logging.getLogger(__name__).warning(
            "line_dedup: %d frequent lines exceed the %d broadcast cap; "
            "keeping the top %d by doc frequency (%d dropped)",
            n_frequent, LINE_DROP_CAP, LINE_DROP_CAP,
            n_frequent - LINE_DROP_CAP,
        )
        from ..stages.topk import dataset_topk

        frequent = dataset_topk(
            frequent,
            [("sum(nd)", "descending"), ("line_md5", "ascending")],
            LINE_DROP_CAP,
        )
    drop = {r["line_md5"] for r in frequent.take_all()}
    return docs.map_batches(
        tx.LineDedup,
        fn_constructor_args=(drop,),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


DOMAIN_LINE_MIN = 3  # per-domain boilerplate needs >= this many docs...
DOMAIN_LINE_PCT = 30  # ...and >= this % of the domain's pages


def q_line_dedup_domain(sf_dir: str):
    """PER-DOMAIN boilerplate line removal (the RefinedWeb variant of
    `line_dedup`: a nav bar repeated across one site is boilerplate even
    if globally rare, while a sentence that recurs across unrelated
    sites is left alone). Pass 0 counts docs per domain (one tiny
    groupby); pass 1 computes per-(domain, line-hash) doc frequency from
    per-batch partials — the shuffle moves (source, hash, count) rows,
    never line text; the two are hash-joined on source and a line is
    boilerplate iff it appears in >= DOMAIN_LINE_MIN docs AND >=
    DOMAIN_LINE_PCT% of its domain's pages (integer cross-multiply, no
    float threshold). The frequent set is broadcast — bounded by
    per-domain boilerplate variety and capped like `line_dedup`; at
    10^12 pages × 10^8 domains the same plan swaps the broadcast for an
    exploded-lines ⋈ frequent-set hash join reassembled by
    groupby(doc_id) ordered on line_no (documented, not needed at any
    tested scale)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    ndocs = docs.groupby("source").aggregate(
        ray.data.aggregate.Count(alias_name="n_docs")
    )
    freq = (
        docs.map_batches(
            tx.domain_line_count_partials,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source", "line_md5"])
        .sum("nd")
    )
    j = freq.join(
        ndocs,
        join_type="inner",
        num_partitions=dd.adaptive_partitions(
            _table_rows(sf_dir, "documents")
        ),
        on=("source",),
    )

    def keep_frequent(t: pa.Table) -> pa.Table:
        nd = t["sum(nd)"]
        ok = pc.and_(
            pc.greater_equal(nd, pa.scalar(DOMAIN_LINE_MIN, pa.int64())),
            pc.greater_equal(
                pc.multiply(nd, pa.scalar(100, pa.int64())),
                pc.multiply(
                    t["n_docs"], pa.scalar(DOMAIN_LINE_PCT, pa.int64())
                ),
            ),
        )
        return t.filter(ok)

    frequent = j.map_batches(
        keep_frequent, batch_format="pyarrow"
    ).materialize()
    n_frequent = frequent.count()
    if n_frequent > LINE_DROP_CAP:
        import logging

        logging.getLogger(__name__).warning(
            "line_dedup_domain: %d frequent (domain, line) pairs exceed "
            "the %d broadcast cap; keeping the top %d by doc frequency "
            "(%d dropped)",
            n_frequent, LINE_DROP_CAP, LINE_DROP_CAP,
            n_frequent - LINE_DROP_CAP,
        )
        from ..stages.topk import dataset_topk

        frequent = dataset_topk(
            frequent,
            [
                ("sum(nd)", "descending"),
                ("source", "ascending"),
                ("line_md5", "ascending"),
            ],
            LINE_DROP_CAP,
        )
    drop = {
        (r["source"], r["line_md5"]) for r in frequent.take_all()
    }
    return docs.map_batches(
        tx.LineDedupDomain,
        fn_constructor_args=(drop,),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


def q_clean_c4(sf_dir: str):
    """C4-style page cleaning (Raffel et al. 2020 §2.2): line rules
    (terminal punctuation, >= 5 words, no 'javascript') and page rules
    (>= 3 surviving lines, no 'lorem ipsum', no '{') over deterministic
    noisy pages derived from documents. Embarrassingly parallel — one
    stateless vectorized-derivation map_batches, no shuffle at any
    scale; the filter drops rows inside the batch so dropped pages
    never reach the object store."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.c4_clean_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_url_dedup(sf_dir: str):
    """URL-level dedup with canonicalization (the Common-Crawl crawl-
    frontier dedup pass): derive the fixture URL per doc (deterministic
    variant classes — tracking params, fragments, case, :443 — mirrored
    by the oracle's CASE), canonicalize with vectorized RE2 kernels, and
    keep the minimum doc_id per canonical URL. One shuffle, keyed by the
    canonical URL string; at 10^12 pages the groupby key could be the
    md5 of the canonical form (16 bytes) with the same plan shape."""
    urls = (
        _read(sf_dir, "documents", ["doc_id", "lang", "source"])
        .map_batches(
            tx.derive_url_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(
            tx.canonicalize_url_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return urls.groupby("canon_url").aggregate(
        ray.data.aggregate.Min("doc_id", alias_name="keep_doc_id"),
        ray.data.aggregate.Count(alias_name="n_variants"),
    )


LM_VOCAB_CAP = 500_000  # broadcast-model ceiling (words); see q_lm_score
LM_OOV_COUNT = 0.5  # pseudo-count for words cut by the cap


def q_lm_score(sf_dir: str):
    """Unigram-LM quality score (the CCNet-style perplexity-proxy
    filter): pass 1 fits the model — per-batch PARTIAL word counts
    (combiner; the shuffle moves (word, count) rows, never text) →
    groupby-sum; pass 2 scores each doc's mean per-token code length
    ``lm_bits = mean(log2(total / count(w)))``. Size-routed like the
    repo's joins: a vocabulary within LM_VOCAB_CAP broadcasts the model
    to a stateless actor-pool map (one pass over the docs, no further
    shuffle); an open-web vocabulary over the cap switches to the EXACT
    distributed-join route — explode (doc_id, word), hash-join the
    counts on word, groupby doc_id — value-identical to the broadcast
    route (equivalence pytest) and to the SQL oracle, at the cost of
    two corpus×token-sized shuffles. No approximation either way."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = (
        docs.map_batches(
            tx.word_count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("word")
        .sum("n")
        .materialize()
    )
    total = counts.sum("sum(n)") or 0
    n_vocab = counts.count()
    if n_vocab > LM_VOCAB_CAP:
        import logging

        logging.getLogger(__name__).info(
            "lm_score: vocabulary of %d words exceeds the %d broadcast "
            "cap; routing to the exact distributed-join scorer", n_vocab,
            LM_VOCAB_CAP,
        )
        return _lm_score_join(docs, counts, total)
    model = {r["word"]: r["sum(n)"] for r in counts.take_all()}
    return docs.map_batches(
        tx.LmScore,
        fn_constructor_args=(
            {"counts": model, "total": total, "oov": LM_OOV_COUNT},
        ),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


def _lm_score_join(docs, counts, total: int):
    """Exact LM scoring without a broadcast model: one shuffle keyed by
    word (hash join token rows to their corpus counts), one keyed by
    doc_id (fold per-token code lengths into the per-doc mean). The
    cross-block float Sum reorders additions; the 6-dp round absorbs
    that (~1e-13), same stance as every other float aggregate here."""
    from ..stages.dedup import adaptive_partitions

    tok = docs.map_batches(
        tx.explode_words_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    cj = counts.map_batches(
        lambda t: pa.table({"word": t["word"], "c": t["sum(n)"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = tok.join(
        cj, join_type="inner", on=("word",),
        num_partitions=adaptive_partitions(int(total)),
    )

    def bits(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bits": pa.array(np.log2(float(total) / c), pa.float64()),
            }
        )

    agg = (
        joined.map_batches(bits, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Sum("bits", alias_name="s"),
            ray.data.aggregate.Count(alias_name="n_tokens"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_tokens"], pa.int64())
        s = np.asarray(t["s"].to_pylist(), dtype=np.float64)
        nv = np.asarray(n.to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n,
                "lm_bits": pa.array(np.round(s / nv, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


LM_LAMBDA = 0.7  # Jelinek–Mercer interpolation weight on the bigram term
LM_BIGRAM_CAP = 2_000_000  # broadcast-model ceiling (distinct bigrams)


def q_lm_bigram(sf_dir: str):
    """Interpolated bigram-LM quality score — the KenLM-style upgrade of
    ``lm_score`` (CCNet's actual filter is a 5-gram KenLM; this is the
    same conditional-probability shape one order up from the unigram
    proxy, with Jelinek–Mercer smoothing against the unigram floor).
    Fit: two partial-count combiners (unigrams and adjacent pairs) →
    groupby-sum — the shuffles move (word, n) / (w1, w2, n) rows, never
    text. Score: position 1 is unigram-coded, position i>1 costs
    ``-log2(lam·cb/cc + (1-lam)·c/T)``. Size-routed exactly like
    ``q_lm_score``: within-cap models broadcast to an autoscaling actor
    pool (one pass, no further shuffle); over-cap vocabularies switch to
    the EXACT distributed-join route (explode token positions, join
    counts on the composite bigram key, groupby doc_id) —
    value-identical by equivalence test. No approximation either way."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    uni = (
        docs.map_batches(
            tx.word_count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("word")
        .sum("n")
        .materialize()
    )
    total = uni.sum("sum(n)") or 0
    big = (
        docs.map_batches(
            tx.bigram_count_partials, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["w1", "w2"])
        .sum("n")
        .materialize()
    )
    if uni.count() > LM_VOCAB_CAP or big.count() > LM_BIGRAM_CAP:
        import logging

        logging.getLogger(__name__).info(
            "lm_bigram: model over the broadcast cap; routing to the "
            "exact distributed-join scorer"
        )
        return _lm_bigram_join(docs, uni, big, total)
    uni_m = {r["word"]: r["sum(n)"] for r in uni.take_all()}
    big_m: dict[tuple[str, str], int] = {}
    ctx_m: dict[str, int] = {}
    for r in big.take_all():
        big_m[(r["w1"], r["w2"])] = r["sum(n)"]
        ctx_m[r["w1"]] = ctx_m.get(r["w1"], 0) + r["sum(n)"]
    return docs.map_batches(
        tx.LmBigramScore,
        fn_constructor_args=(
            {
                "uni": uni_m,
                "big": big_m,
                "ctx": ctx_m,
                "total": total,
                "lam": LM_LAMBDA,
            },
        ),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


def _lm_bigram_join(docs, uni, big, total: int):
    """Exact bigram scoring without a broadcast model: token positions
    explode to (doc_id, w1, w2, bg) rows; first-token rows (w1 = "",
    unigram-coded — no context) take the short path of ONE join against
    the unigram counts, the rest take three hash joins — bigram counts
    on the composite ``bg`` key, context counts on ``w1``, unigram
    counts on ``w2`` — and both bit streams union into one groupby
    doc_id fold. Shuffle volume is O(corpus tokens) of short strings;
    the 6-dp round absorbs cross-block float Sum reorder, same stance
    as ``_lm_score_join``."""
    from ..stages.dedup import adaptive_partitions

    nparts = adaptive_partitions(int(total))
    tok = docs.map_batches(
        tx.explode_bigram_positions_batch, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    firsts = tok.filter(expr="w1 == ''")
    rest = tok.filter(expr="w1 != ''")
    bg_cnt = big.map_batches(
        lambda t: pa.table(
            {
                "bg": pc.binary_join_element_wise(
                    pc.cast(t["w1"], pa.string()),
                    pc.cast(t["w2"], pa.string()),
                    " ",
                ),
                "cb": t["sum(n)"],
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ctx_cnt = big.groupby("w1").sum("sum(n)").map_batches(
        lambda t: pa.table({"w1": t["w1"], "cc": t["sum(sum(n))"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    uni_cnt = uni.map_batches(
        lambda t: pa.table({"w2": t["word"], "c": t["sum(n)"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = (
        rest.join(bg_cnt, join_type="inner", on=("bg",),
                  num_partitions=nparts)
        .join(ctx_cnt, join_type="inner", on=("w1",),
              num_partitions=nparts)
        .join(uni_cnt, join_type="inner", on=("w2",),
              num_partitions=nparts)
    )
    jf = firsts.join(uni_cnt, join_type="inner", on=("w2",),
                     num_partitions=nparts)
    T = float(total)
    lam, one_m = float(LM_LAMBDA), 1.0 - float(LM_LAMBDA)

    def bits(t: pa.Table) -> pa.Table:
        cb = np.asarray(t["cb"].to_pylist(), dtype=np.float64)
        cc = np.asarray(t["cc"].to_pylist(), dtype=np.float64)
        c = np.asarray(t["c"].to_pylist(), dtype=np.float64)
        b = -np.log2(lam * (cb / cc) + one_m * (c / T))
        return pa.table(
            {"doc_id": t["doc_id"], "bits": pa.array(b, pa.float64())}
        )

    def bits_first(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bits": pa.array(np.log2(T / c), pa.float64()),
            }
        )

    agg = (
        j.map_batches(bits, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            jf.map_batches(
                bits_first, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Sum("bits", alias_name="s"),
            ray.data.aggregate.Count(alias_name="n_tokens"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_tokens"], pa.int64())
        s = np.asarray(t["s"].to_pylist(), dtype=np.float64)
        nv = np.asarray(n.to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n,
                "lm2_bits": pa.array(np.round(s / nv, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_chunk_windows(sf_dir: str):
    """Training-sequence chunking: overlapping fixed-size token windows
    (32-token window, 24-token stride) per document — embarrassingly
    parallel flat expansion, no shuffle."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.chunk_windows_batch, batch_format="pyarrow", zero_copy_batch=True
    )


PACK_BUDGET = 512  # tokens per packed training sequence


def q_pack_sequences(sf_dir: str):
    """Deterministic contiguous sequence packing (doc -> fixed-token-
    budget training sequence, in doc_id order) WITHOUT a global sort: a
    distributed prefix sum. Per-doc token counts carry a bounded
    (doc_id // RANK_BUCKET) bucket key; one small groupby sums tokens per
    bucket, the driver cumsums the bucket table (buckets ≪ rows) into
    broadcast base offsets, and each bucket group enumerates its local
    cumsum on top of its base — the same bounded-group decomposition as
    q_global_rank / the bucketed event trio."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tokc(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(t["text"], pattern="[^ ]+"), pa.int64()
        )
        b = pc.cast(
            pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64())),
            pa.int64(),
        )
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n, "bucket": b})

    wt = docs.map_batches(tokc, batch_format="pyarrow", zero_copy_batch=True)
    sums = wt.groupby("bucket").sum("n_tokens").take_all()
    base: dict[int, int] = {}
    cum = 0
    for r in sorted(sums, key=lambda r: r["bucket"]):
        base[r["bucket"]] = cum
        cum += r["sum(n_tokens)"]
    bref = ray.put(base)

    def pack_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        n = np.asarray(g["n_tokens"], dtype=np.int64)
        start = offsets[g["bucket"][0].as_py()] + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "start_tok": pa.array(start, pa.int64()),
                "seq_id": pa.array(start // PACK_BUDGET, pa.int64()),
            }
        )

    return wt.groupby("bucket").map_groups(pack_group, batch_format="pyarrow")


BIGRAM_K = 30


def q_bigram_topk(sf_dir: str):
    """Corpus bigram vocabulary: per-batch partial adjacent-pair counts
    (combiner) -> grouped Sum -> exact global top-K via per-block
    partial top-K (stages.topk), deterministic (n desc, bigram asc)
    tie-break."""
    from ..stages.topk import dataset_topk

    agg = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(
            tx.bigram_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bigram")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )
    return dataset_topk(
        agg, [("n", "descending"), ("bigram", "ascending")], BIGRAM_K
    )


def q_quality_tiers(sf_dir: str):
    """Tier extraction: route every document into a quality tier
    (high / mid / low) from its Gopher-style repetition features — two
    stateless vectorized stages, no shuffle. Thresholds live in
    stages.text (TIER_*), mirrored by the oracle's CASE."""
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            tx.word_stats_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(tx.quality_tier_batch, batch_format="pyarrow")
    )


def q_domain_stats(sf_dir: str):
    """Per-(source, lang) corpus accounting — the crawl-domain rollup of
    a webtext pipeline: one groupby over two low-cardinality keys; the
    mean is derived from (sum, count) after the aggregate so rounding is
    controlled on both sides."""
    agg = (
        _read(sf_dir, "documents", ["source", "lang", "n_chars"])
        .groupby(["source", "lang"])
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_docs"),
            ray.data.aggregate.Sum("n_chars", alias_name="total_chars"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.round(
            pc.divide(
                pc.cast(t["total_chars"], pa.float64()),
                pc.cast(t["n_docs"], pa.float64()),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "source": t["source"],
                "lang": t["lang"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "total_chars": pc.cast(t["total_chars"], pa.int64()),
                "avg_chars": avg,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _bench_grams(sf_dir: str) -> list[str]:
    """Distinct word n-grams of the benchmark docs (same bounded
    doc_id % DECON_MOD derivation as `_decon_phrases`), sorted for
    determinism. Bounded by the benchmark size, never the corpus."""
    src = _read(sf_dir, "documents", ["doc_id", "text"])

    def grams(t: pa.Table) -> pa.Table:
        m = pa.scalar(DECON_MOD, pa.int64())
        mod = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], m), m)
        )
        keep = pc.and_(
            pc.equal(mod, pa.scalar(0, pa.int64())),
            pc.less(t["doc_id"], pa.scalar(DECON_MAX_ID, pa.int64())),
        )
        t = t.filter(keep)
        out: set[str] = set()
        for txt in t["text"].to_pylist():
            out |= tx.doc_ngrams(txt)
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    rows = src.map_batches(grams, batch_format="pyarrow").take_all()
    return sorted({r["g"] for r in rows})


def q_decontaminate_ngram(sf_dir: str):
    """n-gram-overlap decontamination (the GPT-3 / Pile method): flag
    every doc sharing any word 8-gram with the benchmark docs. The
    bounded benchmark gram set broadcasts to an autoscaling actor pool;
    membership is a per-doc set intersection — no shuffle at all."""
    grams = _bench_grams(sf_dir)
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.NgramDecontaminate, fn_constructor_args=(grams,),
        batch_format="pyarrow", concurrency=_apool(), zero_copy_batch=True,
    )


def q_dedup_substring(sf_dir: str):
    """Repeated-substring removal across the corpus — the practical
    distributed shape of exact-substring training-data dedup (Lee et al.
    2022, arXiv:2107.06499; the suffix-array global scan becomes
    stride-aligned 16-token windows): window occurrences hash-shuffle
    once to find windows shared by >= 2 distinct docs, the survivors'
    (doc_id, start) marks groupby to one row per affected doc, a hash
    LEFT join attaches the marks to the docs (unaffected docs pass
    through whole), and a stateless map rebuilds each text with covered
    tokens removed. No broadcast, no driver state; every shuffle is
    O(windows) or O(true duplication volume)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    nparts = dd.adaptive_partitions(_table_rows(sf_dir, "documents"))
    occ = docs.map_batches(
        tx.substr_window_marks, batch_format="pyarrow", zero_copy_batch=True
    )
    # shared iff the window's occurrences span >= 2 distinct docs —
    # detected with a streaming Min/Max aggregate (min(doc_id) !=
    # max(doc_id)), NOT a per-hash map_groups: a boilerplate window
    # present in every doc would otherwise put O(corpus) rows in one
    # group/task. The survivors join back to occurrences hash-partitioned.
    shared = (
        occ.groupby("h")
        .aggregate(
            ray.data.aggregate.Min("doc_id", alias_name="lo"),
            ray.data.aggregate.Max("doc_id", alias_name="hi"),
        )
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["lo"], t["hi"])).select(["h"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    marks = (
        occ.join(shared, join_type="inner", num_partitions=nparts, on=("h",))
        .groupby("doc_id")
        .map_groups(tx.covered_positions_group, batch_format="pyarrow")
    )
    joined = docs.join(
        marks, join_type="left_outer", num_partitions=nparts,
        on=("doc_id",),
    )
    return joined.map_batches(tx.rebuild_dedup_batch, batch_format="pyarrow")


def q_build_training_set(sf_dir: str):
    """The end-to-end webtext -> training-sequences composition, as ONE
    dataflow: quality-tier gate (drop 'low') -> exact dedup keep-first
    (groupby content hash, min doc_id wins) -> 32-token chunking ->
    contiguous packing into 512-token sequences via the bucketed
    distributed prefix sum. Every stage is an operator verified on its
    own elsewhere; this query value-verifies their composition."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = docs.map_batches(
        tx.tier_gate_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def keep_first(g: pa.Table) -> pa.Table:
        i = pc.index(g["doc_id"], pc.min(g["doc_id"]).as_py()).as_py()
        return g.slice(i, 1).select(["doc_id", "text"])

    uniq = kept.groupby("content_md5").map_groups(
        keep_first, batch_format="pyarrow"
    )
    chunks = uniq.map_batches(
        tx.chunk_windows_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "chunk_id", "n_tokens"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64())),
            pa.int64(),
        )
        return t.append_column("bucket", b)

    wt = chunks.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    sums = wt.groupby("bucket").sum("n_tokens").take_all()
    base: dict[int, int] = {}
    cum = 0
    for r in sorted(sums, key=lambda r: r["bucket"]):
        base[r["bucket"]] = cum
        cum += r["sum(n_tokens)"]
    bref = ray.put(base)

    def pack_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[("doc_id", "ascending"),
                              ("chunk_id", "ascending")]
            )
        )
        n = np.asarray(g["n_tokens"], dtype=np.int64)
        start = offsets[g["bucket"][0].as_py()] + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "chunk_id": g["chunk_id"],
                "n_tokens": g["n_tokens"],
                "start_tok": pa.array(start, pa.int64()),
                "seq_id": pa.array(start // PACK_BUDGET, pa.int64()),
            }
        )

    return wt.groupby("bucket").map_groups(pack_group, batch_format="pyarrow")


MIX_SCALE = 1_000_000  # keep-rate resolution (parts per million)


def q_mix_rebalance(sf_dir: str):
    """Data-dependent corpus mixing (the rebalancing step of a
    pretraining data recipe): one tiny groupby counts docs per lang, the
    driver derives keep_rate(lang) = floor(1e6 * min_count / count) —
    downsample every language to the minority's share — and a broadcast
    rate table drives the same deterministic md5(doc_id)-keyed keep rule
    as `sample_stratified`. Aggregate -> broadcast -> stateless filter;
    the only shuffle is over (lang, count) rows."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    counts = ds.groupby("lang").aggregate(
        ray.data.aggregate.Count(alias_name="n")
    ).take_all()
    cmin = min(r["n"] for r in counts)
    rates = {r["lang"]: (MIX_SCALE * cmin) // r["n"] for r in counts}
    rref = ray.put(rates)

    def keep(t: pa.Table) -> pa.Table:
        rt = ray.get(rref)
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        mask = [
            int.from_bytes(_hl.md5(str(i).encode()).digest()[:4], "big")
            % MIX_SCALE < rt[lang]
            for i, lang in zip(ids, langs)
        ]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# training-set assembly extras (session 5): deterministic hash splits,
# BM25 retrieval, embedding outlier filtering, DSIR importance weights
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 100
SPLIT_TRAIN = 80  # buckets [0,80) -> train
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


def bm25_oracle_sql() -> str:
    terms = list(BM25_TERMS)
    tf_cols = ",\n         ".join(
        f"sum(case when w = '{t}' then 1 else 0 end)::double as tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(case when tf{i} > 0 then 1 else 0 end)::double as df{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"ln((n.n - df.df{i} + 0.5) / (df.df{i} + 0.5) + 1.0)"
        f" * a.tf{i} * ({BM25_K1} + 1.0)"
        f" / (a.tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * a.dl"
        f" / av.avgdl))"
        for i in range(len(terms))
    )
    return f"""
with tok as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
n as (select count(*)::double as n from documents),
agg as (
  select doc_id, count(*)::double as dl,
         {tf_cols}
  from tok group by doc_id),
av as (select sum(dl) / (select n from n) as avgdl from agg),
df as (select {df_cols} from agg),
scored as (
  select a.doc_id, round({score_terms}, 6) as score
  from agg a, av, df, n)
select doc_id, score from scored
where score > 0.0
order by score desc, doc_id
limit {BM25_TOPK}
"""


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


CRAWL_DELAY_S = 2  # per-host politeness interval (seconds between fetches)


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
    new = frontier.join(
        crawled,
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


def crawl_frontier_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
crawled as (select url from read_parquet('{pages_dir}/*.parquet')
            where regexp_extract(url, 'p(\\d+)$', 1)::int % 4 <> 3),
f as (
  select dst as url, count(*)::bigint as n_refs
  from l where dst not in (select url from crawled)
  group by dst),
s as (
  select url, split_part(split_part(url, '://', 2), '/', 1) as host,
         n_refs,
         row_number() over (
           partition by split_part(split_part(url, '://', 2), '/', 1)
           order by url) - 1 as slot
  from f)
select url, host, n_refs, slot::bigint as slot,
       (slot * {CRAWL_DELAY_S})::bigint as offset_s
from s
"""


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


# ---------------------------------------------------------------------------
# webtext session 6: WARC ingest, Bloom incremental dedup, CCNet perplexity
# buckets, BPE pair statistics
# ---------------------------------------------------------------------------


def warc_corpus() -> tuple[str, str]:
    """Lazily write the deterministic WARC fixture (real ISO-28500 bytes
    + an independent ground-truth parquet); idempotent, shared by the
    Ray query and the oracle composer."""
    import tempfile

    from ..sources.warc import write_warc_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_warc_240")
    return write_warc_corpus(root, n=240, shards=4)


def q_warc_roundtrip(sf_dir: str):
    """WARC ingest roundtrip — parse Common Crawl's native container
    format from raw bytes into page rows. The WARC FILE is the unit of
    parallelism (``read_binary_files`` -> one row per shard ->
    ``parse_warc_records`` inside ``map_batches``), exactly how CC
    distributes work (one ~1 GiB warc per task); record framing honors
    Content-Length (the fixture plants CRLFCRLF inside bodies to punish
    separator-scanning parsers) and skips warcinfo/request noise
    records. No shuffle anywhere; the oracle reads only the
    independently-written truth parquet, the Ray side only the bytes."""
    from ..sources.warc import parse_warc_records

    warc_dir, _ = warc_corpus()
    ds = rd.read_binary_files(warc_dir, file_extensions=["warc"])

    def parse(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "url": [], "warc_date": [], "status": [], "n_bytes": [],
            "title": [],
        }
        for data in t["bytes"].to_pylist():
            for rec in parse_warc_records(data):
                cols["url"].append(rec["url"])
                cols["warc_date"].append(rec["warc_date"])
                cols["status"].append(rec["status"])
                cols["n_bytes"].append(rec["n_bytes"])
                m = re.search(r"<title>(.*?)</title>", rec["text"], re.S)
                cols["title"].append(m.group(1) if m else "")
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "warc_date": pa.array(cols["warc_date"], pa.string()),
                "status": pa.array(cols["status"], pa.int64()),
                "n_bytes": pa.array(cols["n_bytes"], pa.int64()),
                "title": pa.array(cols["title"], pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def warc_oracle_sql(truth_dir: str) -> str:
    return f"""
select url, warc_date, status, n_bytes,
       coalesce(regexp_extract(text, '<title>(.*?)</title>', 1), '')
         as title
from read_parquet('{truth_dir}/*.parquet')
"""


def q_cdx_index(sf_dir: str):
    """CDX capture-index generation — the random-access lookup table CC
    consumers use to fetch ONE record out of a petabyte of WARC without
    scanning: per response record emit (urlkey SURT, compact timestamp,
    url, payload digest, warc_file, rec_offset, rec_length). Offsets
    come from the parser's forward-only Content-Length arithmetic (the
    fixture's ground truth records the writer's actual byte positions,
    so the hash check proves the parser's coordinates are byte-exact —
    a wrong offset means a broken random read later). Same no-shuffle
    per-file plan as warc_roundtrip; a production CDX additionally
    SORTS by urlkey, which at scale is the one all-to-all exchange
    (range-partitioned writes), deliberately left to the consumer here.
    Digest is md5 (DuckDB-replayable) where real CC uses sha1 — the
    framing, not the hash family, is what's under test.

    Ingest goes through ``WarcDatasource`` — the STREAMING source that
    frames records chunk-by-chunk and emits bounded blocks, so a warc
    file larger than the object-store block target never materializes
    whole (``warc_roundtrip`` keeps the whole-file ``read_binary_files``
    path covered; this query is the driver-gate proof of the streaming
    one — same byte-exact offsets against the writer's ground truth)."""
    from ..sources.warc import WarcDatasource, surt_key

    warc_dir, _ = warc_corpus()
    ds = rd.read_datasource(WarcDatasource(warc_dir, records_per_block=64))

    def index(t: pa.Table) -> pa.Table:
        urlkeys = [surt_key(u) for u in t["url"].to_pylist()]
        ts = [
            re.sub(r"[^0-9]", "", d) for d in t["warc_date"].to_pylist()
        ]
        digests = [
            hashlib.md5(x.encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "urlkey": pa.array(urlkeys, pa.string()),
                "ts": pa.array(ts, pa.string()),
                "url": t["url"],
                "digest": pa.array(digests, pa.string()),
                "warc_file": t["warc_file"],
                "rec_offset": t["rec_offset"],
                "rec_length": t["rec_length"],
            }
        )

    return ds.map_batches(
        index, batch_format="pyarrow", zero_copy_batch=True
    )


def cdx_oracle_sql(truth_dir: str) -> str:
    return f"""
with t as (select * from read_parquet('{truth_dir}/*.parquet')),
s as (
  select *,
    split_part(url, '://', 2) as rest,
    regexp_replace(regexp_replace(
      lower(split_part(split_part(url, '://', 2), '/', 1)),
      ':[0-9]+$', ''), '^www\\.', '') as host
  from t)
select
  array_to_string(list_reverse(string_split(host, '.')), ',') || ')/'
    || (case when position('/' in rest) > 0
             then substr(rest, length(split_part(rest, '/', 1)) + 2)
             else '' end) as urlkey,
  regexp_replace(warc_date, '[^0-9]', '', 'g') as ts,
  url, md5(text) as digest, warc_file,
  "offset" as rec_offset, "length" as rec_length
from s
"""


WARC_FETCH_MOD = 11  # page-number % this == 0 selects the fetch set


def q_warc_fetch(sf_dir: str):
    """Index-driven random access — the OTHER half of the CDX story:
    given an index and a url subset (every 11th page here), fetch ONLY
    those records by seeking to their byte coordinates, never scanning
    the archive. Lookups group by warc_file (ONE small shuffle of index
    rows — bytes never shuffle) so each task opens its file once and
    reads its offsets in ascending order (sequential-ish I/O); at CC
    scale the same plan issues ranged GETs against object storage. The
    oracle answers from the writer's independent ground truth, so a
    single wrong offset/length surfaces as a digest/text mismatch."""
    from ..sources.warc import parse_warc_records

    warc_dir, _ = warc_corpus()
    cdx = q_cdx_index(sf_dir)

    def want(t: pa.Table) -> pa.Table:
        mask = [
            int(u.rsplit("page", 1)[1]) % WARC_FETCH_MOD == 0
            for u in t["url"].to_pylist()
        ]
        return t.filter(pa.array(mask, pa.bool_())).select(
            ["url", "warc_file", "rec_offset", "rec_length"]
        )

    targets = cdx.map_batches(
        want, batch_format="pyarrow", zero_copy_batch=True
    )

    def fetch(g: pa.Table) -> pa.Table:
        path = os.path.join(warc_dir, g["warc_file"][0].as_py())
        g = g.take(pc.sort_indices(g["rec_offset"]))
        urls, status, nb, digest = [], [], [], []
        with open(path, "rb") as f:
            for u, off, ln in zip(
                g["url"].to_pylist(),
                g["rec_offset"].to_pylist(),
                g["rec_length"].to_pylist(),
            ):
                f.seek(off)
                recs = parse_warc_records(f.read(ln) + b"\r\n\r\n")
                assert len(recs) == 1 and recs[0]["url"] == u
                urls.append(u)
                status.append(recs[0]["status"])
                nb.append(recs[0]["n_bytes"])
                digest.append(
                    hashlib.md5(recs[0]["text"].encode()).hexdigest()
                )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "status": pa.array(status, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
                "digest": pa.array(digest, pa.string()),
            }
        )

    return targets.groupby("warc_file").map_groups(
        fetch, batch_format="pyarrow"
    )


def warc_fetch_oracle_sql(truth_dir: str) -> str:
    return f"""
select url, status, n_bytes, md5(text) as digest
from read_parquet('{truth_dir}/*.parquet')
where regexp_extract(url, 'page(\\d+)$', 1)::int % {WARC_FETCH_MOD} = 0
"""


BLOOM_BITS = 1 << 17  # filter width (16 KiB as a bit array)
BLOOM_K = 4  # hash functions


def _bloom_pos(h: str, j: int) -> int:
    return int(
        hashlib.md5(f"{h}:{j}".encode()).hexdigest()[:15], 16
    ) % BLOOM_BITS


def q_bloom_dedup(sf_dir: str):
    """Bloom-filter incremental dedup — the membership gate a crawl
    pipeline runs against the ALREADY-INGESTED corpus before paying for
    full processing of a new snapshot (here the 'prior corpus' is the
    deterministic doc_id%3!=0 two-thirds). Build: per-batch partial
    bit-position sets -> one bounded groupby (<= BLOOM_BITS rows — the
    filter, not the corpus, bounds the shuffle) -> a 128 KiB numpy bit
    array broadcast in the probe map's closure (restart-safe plain
    value; size independent of corpus size, same contract as the DSIR
    model). Probe: stateless vectorized-ish pass marking maybe_dup iff
    all BLOOM_K positions are set. False positives are REPORTED, not
    hidden (``false_pos`` column) — the honest-approximation stance; at
    these parameters (m=2^17, k=4, n~2/3 corpus) FP rate is negligible
    for the fixtures and tunable by the module constants. The oracle
    replays the exact md5 position arithmetic in SQL, so the hash check
    covers the filter's approximate semantics bit-for-bit."""
    import numpy as _np

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def prior_positions(t: pa.Table) -> pa.Table:
        pos: set[int] = set()
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did % 3 == 0:
                continue  # not in the prior corpus
            h = hashlib.md5((txt or "").encode()).hexdigest()
            for j in range(BLOOM_K):
                pos.add(_bloom_pos(h, j))
        return pa.table({"pos": pa.array(sorted(pos), pa.int64())})

    pos_rows = (
        docs.map_batches(
            prior_positions, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pos")
        .count()
        .take_all()  # <= BLOOM_BITS rows by construction
    )
    bits = _np.zeros(BLOOM_BITS, dtype=bool)
    bits[[r["pos"] for r in pos_rows]] = True

    def probe(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        maybe, prior = [], []
        for did, txt in zip(ids, t["text"].to_pylist()):
            h = hashlib.md5((txt or "").encode()).hexdigest()
            maybe.append(
                all(bits[_bloom_pos(h, j)] for j in range(BLOOM_K))
            )
            prior.append(did % 3 != 0)
        m = _np.asarray(maybe)
        p = _np.asarray(prior)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "is_prior": pa.array(p, pa.bool_()),
                "maybe_dup": pa.array(m, pa.bool_()),
                "false_pos": pa.array(m & ~p, pa.bool_()),
            }
        )

    return docs.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    )


BLOOM_DEDUP_SQL = f"""
with k as (
  select doc_id, md5(text) as h, (doc_id % 3 <> 0) as is_prior
  from documents),
ppos as (
  select distinct
    (('0x' || substr(md5(h || ':' || j::varchar), 1, 15))::ubigint
     % {BLOOM_BITS})::bigint as pos
  from k, generate_series(0, {BLOOM_K - 1}) t(j)
  where is_prior),
q as (
  select doc_id, is_prior,
    (('0x' || substr(md5(h || ':' || j::varchar), 1, 15))::ubigint
     % {BLOOM_BITS})::bigint as pos
  from k, generate_series(0, {BLOOM_K - 1}) t(j)),
m as (
  select doc_id, is_prior, bool_and(p.pos is not null) as maybe_dup
  from q left join ppos p using (pos)
  group by doc_id, is_prior)
select doc_id, is_prior, maybe_dup,
       (maybe_dup and not is_prior) as false_pos
from m
"""


CCNET_HIST_DP = 2  # histogram quantization (decimal places) for cutoffs


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style per-language perplexity tertiles (head / middle /
    tail — the bucketing Common Crawl curation uses to grade pages by
    LM quality before sampling). Reuses the ``lm_score`` dataflow for
    per-doc bits, joins lang on doc_id (one hash join), then finds the
    per-lang tertile cutoffs from a QUANTIZED histogram: per-batch
    (lang, floor(bits*100)/100, n) partials -> a bounded groupby
    (#langs x #distinct-centibit values — thousands of rows at any
    corpus size, never O(docs)) -> driver cumsum -> two cutoff scalars
    per lang broadcast to a stateless assign pass. No global sort, no
    per-lang giant group. Determinism: lm_bits is 6-dp-rounded
    identically in both engines (the green lm_score oracle is exactly
    that statement), and floor(x*100) on bit-identical doubles is
    bit-identical, so bucket assignment cannot straddle engines."""
    bits = q_lm_score(sf_dir)
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])
    joined = bits.join(
        langs, join_type="inner", on=("doc_id",),
        num_partitions=dd.adaptive_partitions(
            _table_rows(sf_dir, "documents")
        ),
    )

    def hist(t: pa.Table) -> pa.Table:
        agg: dict[tuple[str, float], int] = {}
        bq = np.floor(
            np.asarray(t["lm_bits"].to_pylist(), dtype=np.float64) * 100.0
        ) / 100.0
        for lang, b in zip(t["lang"].to_pylist(), bq):
            k = (lang, float(b))
            agg[k] = agg.get(k, 0) + 1
        return pa.table(
            {
                "lang": pa.array([k[0] for k in agg], pa.string()),
                "bq": pa.array([k[1] for k in agg], pa.float64()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    rows = (
        joined.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "bq"])
        .sum("n")
        .take_all()  # bounded: #langs x #centibit values
    )
    by_lang: dict[str, list[tuple[float, int]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["bq"], r["sum(n)"]))
    cuts: dict[str, tuple[float, float]] = {}
    for lang, hs in by_lang.items():
        hs.sort()
        tot = sum(n for _, n in hs)
        t1 = -(-tot // 3)  # ceil(tot/3)
        t2 = -(-2 * tot // 3)
        cum, c1, c2 = 0, None, None
        for b, n in hs:
            cum += n
            if c1 is None and cum >= t1:
                c1 = b
            if c2 is None and cum >= t2:
                c2 = b
        cuts[lang] = (c1, c2)

    def assign(t: pa.Table) -> pa.Table:
        bq = np.floor(
            np.asarray(t["lm_bits"].to_pylist(), dtype=np.float64) * 100.0
        ) / 100.0
        buckets = []
        for lang, b in zip(t["lang"].to_pylist(), bq):
            c1, c2 = cuts[lang]
            buckets.append(
                "head" if b <= c1 else "middle" if b <= c2 else "tail"
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "lm_bits": t["lm_bits"],
                "bucket": pa.array(buckets, pa.string()),
            }
        )

    return joined.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def ccnet_oracle_sql() -> str:
    """Composed lazily: embeds the lm_score oracle (defined with the
    registry below) as the bits subquery."""
    return """
with s as (
  select l.doc_id, d.lang, l.lm_bits,
         floor(l.lm_bits * 100) / 100 as bq
  from (""" + ORACLES["lm_score"] + """) l
  join documents d using (doc_id)),
h as (select lang, bq, count(*)::bigint as n from s group by lang, bq),
c as (
  select lang, bq,
         sum(n) over (partition by lang order by bq) as cum,
         sum(n) over (partition by lang) as tot
  from h),
cuts as (
  select lang,
         min(case when cum >= ceil(tot / 3.0) then bq end) as c1,
         min(case when cum >= ceil(2 * tot / 3.0) then bq end) as c2
  from c group by lang)
select s.doc_id, s.lang, s.lm_bits,
       case when s.bq <= cuts.c1 then 'head'
            when s.bq <= cuts.c2 then 'middle'
            else 'tail' end as bucket
from s join cuts using (lang)
"""


# q_lm_score emits (doc_id, n_tokens, lm_bits); the ccnet join keeps
# n_tokens out of the output, so the oracle's bits subquery matches.


BPE_TOPK = 50  # merge candidates reported


def q_bpe_pairs(sf_dir: str):
    """BPE merge statistics — the adjacent-symbol pair frequencies that
    drive the first merge step of byte-pair-encoding tokenizer training
    (Sennrich et al. 2016): each word contributes its within-word
    character pairs plus a (last-char, '</w>') end-of-word pair, counted
    across the corpus. Per-batch dict combiners bound the shuffle to
    (pair, partial n) rows — the alphabet², never the corpus; integer
    counts are order-free; ranking is the repo's partial+final top-K
    (O(K x blocks) network rows, no global sort). Ties at the K
    boundary break by pair ascending in both engines."""
    docs = _read(sf_dir, "documents", ["text"])

    def partials(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for txt in t["text"].to_pylist():
            for w in (txt or "").split(" "):
                if not w:
                    continue
                syms = list(w)
                syms.append("</w>")
                for a, b in zip(syms, syms[1:]):
                    k = a + b
                    agg[k] = agg.get(k, 0) + 1
        return pa.table(
            {
                "pair": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(
            partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pair")
        .sum("n")
        .map_batches(
            lambda t: pa.table({"pair": t["pair"], "n": t["sum(n)"]}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    from ..stages.topk import dataset_topk

    return dataset_topk(
        counts, [("n", "descending"), ("pair", "ascending")], BPE_TOPK
    )


BPE_PAIRS_SQL = f"""
with tok as (
  select w
  from (select unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
sym as (select w, unnest(generate_series(1, length(w))) as i from tok),
p as (
  select case when i < length(w) then substr(w, i, 2)
              else substr(w, i, 1) || '</w>' end as pair
  from sym)
select pair, count(*)::bigint as n
from p group by pair
order by n desc, pair
limit {BPE_TOPK}
"""


BPE_MERGES = 8  # learned merge rounds
# size routing for the merge-learning loop: a distinct-WORD table at or
# under this row count runs the 8 rounds on the driver (the table is the
# vocabulary, not the corpus — pure Ray-op overhead dominates 8 tiny
# shuffles otherwise: 148 s -> ~4 s at sf0.1); above it, the distributed
# per-round groupby loop below handles open-web vocabularies
BPE_DRIVER_VOCAB_CAP = 200_000


def _bpe_learn_driver(
    words: list[tuple[str, int]]
) -> list[tuple[int, str, str, int]]:
    """Driver-route merge learning over the (distinct word, count)
    table: the IDENTICAL recurrence as the distributed loop — pair
    counts weighted by word frequency, max by (n desc, pair asc),
    left-to-right non-overlapping merge application — equivalence-tested
    against the distributed route in tests/test_webtext_session16.py."""
    wt = [(list(w) + ["</w>"], n) for w, n in words]
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, BPE_MERGES + 1):
        agg: dict[tuple[str, str], int] = {}
        for s, n in wt:
            for a, b in zip(s, s[1:]):
                agg[(a, b)] = agg.get((a, b), 0) + n
        if not agg:
            break
        (left, right), best = min(
            agg.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((k, left, right, best))
        merged = left + right
        nxt = []
        for s, n in wt:
            r: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    r.append(merged)
                    i += 2
                else:
                    r.append(s[i])
                    i += 1
            nxt.append((r, n))
        wt = nxt
    return merges


def _bpe_learn(sf_dir: str) -> list[tuple[int, str, str, int]]:
    """The BPE merge-learning loop shared by q_bpe_train (which emits
    the merge table) and q_bpe_encode (which applies the merges):
    returns [(merge_idx, left, right, count)]. Memoized per
    (path, mtime) like _gate_centroids — one gate/bench run calls it
    from both the train and encode queries."""
    path = _pq(sf_dir, "documents")
    return _bpe_learn_cached(sf_dir, path, os.path.getmtime(path))


@functools.lru_cache(maxsize=8)
def _bpe_learn_cached(
    sf_dir: str, _path: str, _mtime: float
) -> list[tuple[int, str, str, int]]:
    docs = _read(sf_dir, "documents", ["text"])

    def word_partials(t: pa.Table) -> pa.Table:
        agg: dict[str, int] = {}
        for txt in t["text"].to_pylist():
            for w in (txt or "").split(" "):
                if w and w.isascii() and w.isalpha() and w.islower():
                    agg[w] = agg.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(agg.keys()), pa.string()),
                "n": pa.array(list(agg.values()), pa.int64()),
            }
        )

    def to_syms(t: pa.Table) -> pa.Table:
        syms = [
            " ".join(list(w) + ["</w>"]) for w in t["word"].to_pylist()
        ]
        return pa.table(
            {"syms": pa.array(syms, pa.string()), "n": t["sum(n)"]}
        )

    counts_ds = (
        docs.map_batches(
            word_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("word")
        .sum("n")
        .materialize()
    )
    if counts_ds.count() <= BPE_DRIVER_VOCAB_CAP:
        # the distinct-word table IS the working set of all 8 rounds:
        # under the cap, run them on the driver (same recurrence, same
        # tie-break) instead of paying 8 tiny shuffles of fixed overhead
        rows = counts_ds.take_all()
        return _bpe_learn_driver(
            [(r["word"], int(r["sum(n)"])) for r in rows]
        )

    wt = counts_ds.map_batches(to_syms, batch_format="pyarrow").materialize()

    from ..stages.topk import dataset_topk

    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, BPE_MERGES + 1):

        def pair_partials(t: pa.Table) -> pa.Table:
            agg: dict[str, int] = {}
            for syms, n in zip(
                t["syms"].to_pylist(), t["n"].to_pylist()
            ):
                s = syms.split(" ")
                for a, b in zip(s, s[1:]):
                    key = a + " " + b
                    agg[key] = agg.get(key, 0) + n
            return pa.table(
                {
                    "pair": pa.array(list(agg.keys()), pa.string()),
                    "n": pa.array(list(agg.values()), pa.int64()),
                }
            )

        counts = (
            wt.map_batches(
                pair_partials, batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("pair")
            .sum("n")
            .map_batches(
                lambda t: pa.table({"pair": t["pair"], "n": t["sum(n)"]}),
                batch_format="pyarrow",
            )
        )
        top = dataset_topk(
            counts, [("n", "descending"), ("pair", "ascending")], 1
        ).take_all()
        if not top:
            break
        left, right = top[0]["pair"].split(" ")
        merges.append((k, left, right, int(top[0]["n"])))
        merged = left + right

        def apply_merge(
            t: pa.Table, a: str = left, b: str = right, m: str = merged
        ) -> pa.Table:
            out = []
            for syms in t["syms"].to_pylist():
                s = syms.split(" ")
                r: list[str] = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        r.append(m)
                        i += 2
                    else:
                        r.append(s[i])
                        i += 1
                out.append(" ".join(r))
            return pa.table(
                {"syms": pa.array(out, pa.string()), "n": t["n"]}
            )

        wt = wt.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    return merges


def q_bpe_train(sf_dir: str):
    """BPE tokenizer TRAINING (Sennrich et al. 2016) — the iterative
    merge loop on top of ``bpe_pairs``'s statistics: learn the first
    ``BPE_MERGES`` merges over the corpus. Scale shape: pass 1 collapses
    the corpus to the word-frequency table (per-batch dict combiners,
    one groupby — bounded by VOCABULARY, never corpus size; this is why
    classic BPE training scales); each merge round is then pair-count
    partials + groupby + a top-1 partial/final reduce over that word
    table, and a stateless merge-apply map. Only the single winning pair
    per round (O(1)) ever reaches the driver. Ties break by (count desc,
    pair asc) in both engines; merge application is the standard
    left-to-right non-overlapping scan, replayed in SQL via a
    wrapped-symbol string replace (``(a)(b) -> (ab)`` — per-symbol
    wrappers make leftmost non-overlapping replace identical to the
    scan). Restricted to ``^[a-z]+$`` words like the published BPE
    demos; ``</w>`` is the end-of-word symbol."""
    merges = _bpe_learn(sf_dir)
    return rd.from_arrow(
        pa.table(
            {
                "merge_idx": pa.array([m[0] for m in merges], pa.int64()),
                "left_sym": pa.array([m[1] for m in merges], pa.string()),
                "right_sym": pa.array([m[2] for m in merges], pa.string()),
                "merged": pa.array(
                    [m[1] + m[2] for m in merges], pa.string()
                ),
                "n": pa.array([m[3] for m in merges], pa.int64()),
            }
        )
    )


def q_bpe_encode(sf_dir: str):
    """BPE tokenizer APPLICATION — the encode half of the train/apply
    loop (q_bpe_train learns the merges; this tokenizes the corpus with
    them and emits per-doc token counts, the number every packing /
    budget / fertility stage downstream consumes). The merge list is
    O(BPE_MERGES) driver state broadcast into a stateless map; encoding
    replays the learned merges in rank order with the same left-to-right
    non-overlapping scan as training, memoized per distinct word per
    batch (Zipf: a batch re-sees few distinct words). Words outside the
    trained ``^[a-z]+$`` class count one token each (byte-fallback
    analog). No shuffle at all — the expensive part (learning) is shared
    via _bpe_learn; the oracle replays learning AND encoding in SQL,
    carrying each word through the unrolled merge rounds."""
    merges = [(m[1], m[2]) for m in _bpe_learn(sf_dir)]

    def encode_doc_batch(t: pa.Table) -> pa.Table:
        memo: dict[str, int] = {}

        def n_sym(w: str) -> int:
            got = memo.get(w)
            if got is not None:
                return got
            s = list(w) + ["</w>"]
            for a, b in merges:
                r: list[str] = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        r.append(a + b)
                        i += 2
                    else:
                        r.append(s[i])
                        i += 1
                s = r
            memo[w] = len(s)
            return memo[w]

        ids, n_words, n_tok = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            words = [w for w in (txt or "").split(" ") if w]
            if not words:  # oracle parity: no token rows -> no output row
                continue
            total = 0
            for w in words:
                if w.isascii() and w.isalpha() and w.islower():
                    total += n_sym(w)
                else:
                    total += 1
            ids.append(did)
            n_words.append(len(words))
            n_tok.append(total)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        encode_doc_batch, batch_format="pyarrow", zero_copy_batch=True,
    )


def bpe_train_oracle_sql() -> str:
    """Unrolled replay of q_bpe_train's merge loop: the word-frequency
    table as wrapped-symbol strings ``(h)(i)(</w>)``; per round, pair
    counts by lateral position unnest, the (count desc, pair asc) top-1,
    and the wrapped string replace that equals the engine's
    left-to-right scan merge."""
    rounds = []
    prev = "w0"
    for k in range(1, BPE_MERGES + 1):
        rounds.append(f"""
p{k} as materialized (
  select s[i] || ' ' || s[i + 1] as pair, n
  from (
    select s, n, unnest(generate_series(1, len(s) - 1)) as i
    from (select string_split(substr(spaced, 2, length(spaced) - 2),
                              ')(') as s, n
          from {prev}))),
b{k} as materialized (
  select {k}::bigint as merge_idx,
         split_part(pair, ' ', 1) as left_sym,
         split_part(pair, ' ', 2) as right_sym, n
  from (select pair, sum(n)::bigint as n from p{k} group by pair
        order by n desc, pair limit 1)),
w{k} as materialized (
  select replace(spaced,
                 '(' || (select left_sym from b{k}) || ')(' ||
                 (select right_sym from b{k}) || ')',
                 '(' || (select left_sym from b{k}) ||
                 (select right_sym from b{k}) || ')') as spaced, n
  from {prev})""")
        prev = f"w{k}"
    union = "\nunion all\n".join(
        f"select merge_idx, left_sym, right_sym, left_sym || right_sym"
        f" as merged, n from b{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    return f"""
with words as (
  select w as word, count(*)::bigint as n
  from (select unnest(string_split(text, ' ')) as w from documents)
  where regexp_matches(w, '^[a-z]+$')
  group by w),
w0 as materialized (
  select '(' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substr(word, i, 1)), ')(')
         || ')(</w>)' as spaced, n
  from words),{",".join(rounds)}
{union}
"""


# ---------------------------------------------------------------------------
# session-7 additions: reservoir sample, per-domain dup accounting,
# funnel, bounded range join, HyperLogLog, HITS
# ---------------------------------------------------------------------------

RESERVOIR_K = 100


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
            edges.join(vec, join_type="inner", num_partitions=nparts,
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

    out = avec.join(hvec, join_type="inner", num_partitions=nparts,
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


def hits_oracle_sql(pages_dir: str, iters: int = HITS_ITERS) -> str:
    """Unrolled replay of q_hits_rank's integer recurrence (the
    pagerank_oracle_sql pattern): same exact integer sums, the same
    ceil-divide rescale via greatest((max+S-1)//S, 1), ghost-zero
    semantics via coalesce over the full page list, ending in the
    identical int -> double divisions."""
    s = HITS_SCALE
    parts = []
    prev_h = "h0"
    for k in range(1, iters + 1):
        parts.append(f""",
a{k}raw as (
  select e.dst as url, sum(hp.v)::bigint as s
  from edges e join {prev_h} hp on e.src = hp.url group by e.dst),
a{k}q as (
  select greatest((max(s) + {s - 1}) // {s}, 1) as q from a{k}raw),
a{k} as (
  select p.url, coalesce(ar.s, 0) // (select q from a{k}q) as v
  from pages p left join a{k}raw ar using (url)),
h{k}raw as (
  select e.src as url, sum(ap.v)::bigint as s
  from edges e join a{k} ap on e.dst = ap.url group by e.src),
h{k}q as (
  select greatest((max(s) + {s - 1}) // {s}, 1) as q from h{k}raw),
h{k} as (
  select p.url, coalesce(hr.s, 0) // (select q from h{k}q) as v
  from pages p left join h{k}raw hr using (url))""")
        prev_h = f"h{k}"
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
links as ({outlinks_oracle_sql(pages_dir)}),
edges as (select src, dst from links),
pages as (select url from pages_raw),
h0 as (select url, {s}::bigint as v from pages){"".join(parts)}
select a{iters}.url, a{iters}.v / {s}.0 as authority,
       h{iters}.v / {s}.0 as hub
from a{iters} join h{iters} using (url)
"""


def dedup_eval_oracle_sql() -> str:
    """Replay of q_dedup_eval_lsh: the shared minhash CTE over the
    md5-sampled subset gives the candidate `pairs`; the exact truth is
    the same shingle-set Jaccard the dedup family defines (empty-set
    cases mirrored from dd.ngram_jaccard: both empty -> 1.0, one empty
    -> 0.0)."""
    body = _minhash_cte_body(source="s")
    return f"""
with s as (
  select doc_id, text from documents
  order by ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger,
           doc_id
  limit {DEDUP_EVAL_K}),
{body},
sd as (select doc_id, list_distinct(shingles) as sd from sh),
truth as (
  select x.doc_id as a, y.doc_id as b
  from sd x join sd y on x.doc_id < y.doc_id
  where case
          when len(x.sd) = 0 and len(y.sd) = 0 then 1.0
          when len(x.sd) = 0 or len(y.sd) = 0 then 0.0
          else len(list_intersect(x.sd, y.sd))::double /
               (len(x.sd) + len(y.sd) - len(list_intersect(x.sd, y.sd)))
        end >= 0.5),
tp as (select count(*)::bigint as n
       from pairs p join truth t on p.a = t.a and p.b = t.b),
np as (select count(*)::bigint as n from pairs),
nt as (select count(*)::bigint as n from truth)
select np.n as n_pred, nt.n as n_true, tp.n as tp,
       (case when np.n > 0 then tp.n * 1000000 // np.n
             else 0 end)::bigint as precision_ppm,
       (case when nt.n > 0 then tp.n * 1000000 // nt.n
             else 0 end)::bigint as recall_ppm
from np, nt, tp
"""


def url_history_oracle_sql(pages_dir: str) -> str:
    return f"""
select url, min(warc_ts) as first_ts, max(warc_ts) as last_ts,
       count(*)::bigint as n_captures,
       count(distinct coalesce(text, ''))::bigint as n_revisions,
       (case when count(*) > 1
             then (count(distinct coalesce(text, '')) - 1) * 1000000
                  // (count(*) - 1)
             else 0 end)::bigint as churn_ppm
from read_parquet('{pages_dir}/*.parquet')
group by url
"""


def degree_distribution_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
d as (select src, count(*)::bigint as out_degree from l group by src)
select out_degree, count(*)::bigint as n_pages from d group by out_degree
"""


def cocitation_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
d as (select distinct src, dst from l),
deg as (select src, count(*)::bigint as deg from d group by src),
p as (
  select x.dst as a, y.dst as b, 1000000 // dg.deg as w
  from d x join d y on x.src = y.src and x.dst < y.dst
  join deg dg on dg.src = x.src)
select a, b, count(*)::bigint as n_common, sum(w)::bigint as aa_ppm
from p group by a, b
having count(*) >= {COCITE_MIN_COMMON}
"""


def link_components_oracle_sql(pages_dir: str) -> str:
    """Replay of q_link_components: same md5-60-bit node ids, same
    intra-domain + known-target edge filter, self-loops for singletons,
    min-label components via the recursive-CTE idiom shared with the
    dedup_minhash_clusters oracle, then the two id->url joins."""
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
l as ({outlinks_oracle_sql(pages_dir)}),
h as (select url, ('0x' || substr(md5(url), 1, 15))::bigint as hid
      from pages_raw),
e0 as (
  select src, dst from l
  where src <> dst
    and split_part(split_part(src, '://', 2), '/', 1)
        = split_part(split_part(dst, '://', 2), '/', 1)),
eh as (select hs.hid as a, hd.hid as b
       from e0 join h hs on hs.url = e0.src
               join h hd on hd.url = e0.dst),
edges as (select a as src, b as dst from eh
          union select b, a from eh
          union select hid, hid from h),
comp as (
  select node, rep from (
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached)
    select node, min(reached) as rep from r group by node))
select hu.url, hr.url as component
from comp join h hu on hu.hid = comp.node
          join h hr on hr.hid = comp.rep
"""


def triangles_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
d as (select distinct src, dst from l where src <> dst),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from d)
select count(*)::bigint as n_triangles
from und e1
join und e2 on e2.a = e1.b
join und e3 on e3.a = e1.a and e3.b = e2.b
"""


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


def _hll_oracle_sql() -> str:
    """Replays the HLL sketch exactly in SQL: same 60-bit md5 hash, the
    leading-zero rank as an unrolled CASE over the 54-bit suffix, exact
    integer register sums, and the identical single double division (the
    numerator literal is repr'd from the engine's own constant)."""
    from ..stages import sketch as sk

    suffix = sk._HLL_SUFFIX_BITS
    cases = [f"when w = 0 then {suffix + 1}"]
    for k in range(suffix - 1, -1, -1):
        cases.append(f"when w >= {1 << k} then {suffix - k}")
    rank_case = "case " + " ".join(cases) + " end"
    num = repr(sk.HLL_NUM)
    return f"""
with h as (
  select distinct
    ('0x' || substr(md5(cast(event_id as varchar)), 1, 15))::ubigint::bigint
      as hv
  from events where event_id is not null),
rw as (select hv >> {suffix} as j,
              hv & {(1 << suffix) - 1} as w from h),
mr as (select j, max({rank_case}) as m_j from rw group by j),
regs as (
  select t.j, coalesce(mr.m_j, 0) as m_j
  from (select unnest(generate_series(0, {sk.HLL_M - 1})) as j) t
  left join mr using (j)),
s as (select sum(1::bigint << ({suffix + 1} - m_j))::bigint as s_scaled,
             sum(case when m_j = 0 then 1 else 0 end)::bigint as v_zero
      from regs)
select {sk.HLL_M}::bigint as m, v_zero, s_scaled,
       round(case when {num} / s_scaled <= {2.5 * sk.HLL_M}
                   and v_zero > 0
                  then {sk.HLL_M} * ln({sk.HLL_M}.0 / v_zero)
                  else {num} / s_scaled end, 6) as est_distinct
from s
"""


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
    named = comp.join(hmap, join_type="inner", num_partitions=nparts,
                      on=("doc_id",), right_on=("hid",))
    return (
        named.join(hmap, join_type="inner", num_partitions=nparts,
                   on=("rep_id",), right_on=("hid",), right_suffix="_rep")
        .map_batches(
            lambda t: pa.table(
                {"source": t["source"], "mirror_rep": t["source_rep"]}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def mirror_domains_oracle_sql() -> str:
    """Replay of q_mirror_domains: syndication edges over the setsim
    pair CTE, md5-60 node ids, self-loops, min-label recursive-CTE
    components (the link_components idiom), id->name joins."""
    return f"""
with pr as ({_setsim_oracle_sql()}),
sy as (
  select least(da.source, db.source) as src_a,
         greatest(da.source, db.source) as src_b
  from pr
  join documents da on da.doc_id = pr.a
  join documents db on db.doc_id = pr.b),
srcs as (select distinct source from documents),
h as (select source, ('0x' || substr(md5(source), 1, 15))::bigint as hid
      from srcs),
e0 as (select distinct src_a, src_b from sy where src_a <> src_b),
eh as (select ha.hid as a, hb.hid as b
       from e0 join h ha on ha.source = e0.src_a
               join h hb on hb.source = e0.src_b),
edges as (select a as src, b as dst from eh
          union select b, a from eh
          union select hid, hid from h),
comp as (
  select node, rep from (
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached)
    select node, min(reached) as rep from r group by node))
select hu.source, hr.source as mirror_rep
from comp join h hu on hu.hid = comp.node
          join h hr on hr.hid = comp.rep
"""


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
        nbr = dire.join(labels, join_type="inner",
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


def label_prop_oracle_sql(pages_dir: str) -> str:
    """Unrolled synchronous replay: round k joins the directed edge
    list with round k-1's labels and picks (count desc, label asc)
    per node. All rounds materialized."""
    rounds = []
    prev = "l0"
    for k in range(1, LP_ITERS + 1):
        rounds.append(f"""
l{k} as materialized (
  select v as node, lab from (
    select e.v, l.lab, count(*) as c,
           row_number() over (partition by e.v
                              order by count(*) desc, l.lab asc) as rn
    from dire e join {prev} l on l.node = e.u
    group by e.v, l.lab)
  where rn = 1)""")
        prev = f"l{k}"
    return f"""
with e as ({outlinks_oracle_sql(pages_dir)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from e where src <> dst),
dire as (select a as v, b as u from und
         union all select b, a from und),
l0 as materialized (select distinct v as node, v as lab from dire),{",".join(rounds)}
select node as url, lab as community from {prev}
"""


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
    internal = _outlinks_ds(pages_dir).map_batches(
        intra, batch_format="pyarrow"
    ).join(hmap, join_type="inner", num_partitions=nparts,
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
    named = comp.join(hmap, join_type="inner", num_partitions=nparts,
                      on=("doc_id",), right_on=("hid",))
    return (
        named.join(hmap, join_type="inner", num_partitions=nparts,
                   on=("rep_id",), right_on=("hid",), right_suffix="_rep")
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
    wedges = und.join(und, join_type="inner", num_partitions=nparts,
                      on=("b",), right_on=("a",), right_suffix="_2")
    tris = wedges.join(und, join_type="inner", num_partitions=nparts,
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
    j1 = sel.join(uni, join_type="inner", num_partitions=nparts,
                  on=("w1",), right_on=("w",))
    j2 = j1.join(uni, join_type="inner", num_partitions=nparts,
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


def scd2_oracle_sql(pages_dir: str) -> str:
    """Window replay: lag detects content changes, a running change-sum
    numbers the intervals, lead chains valid_to to the next interval's
    valid_from (NULL on the open one)."""
    return f"""
with s as (select url, warc_ts, md5(text) as h
           from read_parquet('{pages_dir}/*.parquet')),
c as (select *, case when lag(h) over
        (partition by url order by warc_ts) is distinct from h
        then 1 else 0 end as chg
      from s),
g as (select *, sum(chg) over (partition by url order by warc_ts
        rows unbounded preceding) as grp from c),
iv as (select url, grp, min(h) as content_md5,
              min(warc_ts) as valid_from,
              count(*)::bigint as n_captures
       from g group by url, grp)
select url, content_md5, valid_from,
       lead(valid_from) over (partition by url order by valid_from)
         as valid_to,
       n_captures
from iv
"""


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


def url_templates_oracle_sql(pages_dir: str) -> str:
    return f"""
with t as (
  select regexp_replace(regexp_replace(url, '=[^&#]*', '=V', 'g'),
                        '[0-9]+', 'N', 'g') as template,
         url, md5(coalesce(text, '')) as th
  from read_parquet('{pages_dir}/*.parquet')),
nu as (select template, count(distinct url)::bigint as n_urls
       from t group by 1),
nt as (select template, count(distinct th)::bigint as n_texts
       from t group by 1)
select nu.template, nu.n_urls, nt.n_texts,
       (nu.n_urls >= {TRAP_MIN_URLS}
        and nt.n_texts * {TRAP_DUP_FACTOR} <= nu.n_urls) as trap
from nu join nt using (template)
"""


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
        truth.join(
            pred, join_type="inner",
            num_partitions=dd.adaptive_partitions(max(n_true, n_pred)),
            on=("a", "b"),
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


def dedup_threshold_sweep_oracle_sql() -> str:
    """Replay of q_dedup_threshold_sweep: the dedup_eval sample + minhash
    CTE give the tau-independent candidate pairs; exact shingle-set
    (inter, union) per sample pair; per-tau truth by integer
    cross-multiply; left join keeps taus with zero true pairs."""
    body = _minhash_cte_body(source="s")
    tau_rows = ", ".join(f"({t})" for t in SWEEP_TAUS_1E4)
    return f"""
with s as (
  select doc_id, text from documents
  order by ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger,
           doc_id
  limit {DEDUP_EVAL_K}),
{body},
sd as (select doc_id, list_distinct(shingles) as sd from sh),
pj as (
  select x.doc_id as a, y.doc_id as b,
         len(list_intersect(x.sd, y.sd))::bigint as i,
         (len(x.sd) + len(y.sd)
          - len(list_intersect(x.sd, y.sd)))::bigint as u
  from sd x join sd y on x.doc_id < y.doc_id),
np as (select count(*)::bigint as n from pairs),
taus(tau) as (values {tau_rows}),
tr as (
  select taus.tau, pj.a, pj.b,
         exists (select 1 from pairs p
                 where p.a = pj.a and p.b = pj.b) as hit
  from taus join pj on (pj.u = 0 or pj.i * 10000 >= taus.tau * pj.u)),
agg as (
  select taus.tau, count(tr.a)::bigint as n_true,
         coalesce(sum(case when tr.hit then 1 else 0 end), 0)::bigint as tp
  from taus left join tr on tr.tau = taus.tau
  group by taus.tau)
select agg.tau as tau_1e4, np.n as n_pred, agg.n_true, agg.tp,
       (case when np.n > 0 then agg.tp * 1000000 // np.n
             else 0 end)::bigint as precision_ppm,
       (case when agg.n_true > 0 then agg.tp * 1000000 // agg.n_true
             else 0 end)::bigint as recall_ppm
from agg, np
"""


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


def phrase_search_oracle_sql() -> str:
    """Overlap-aware positional adjacency replayed as a DuckDB list
    comprehension over the tokenized text — one UNION ALL arm per query
    phrase (same single-space tokenization as the engine's split)."""
    arms = []
    for p in PHRASES:
        w1, w2, w3 = p.split()
        arms.append(f"""
select '{p}' as phrase, doc_id,
       len([i for i in range(1, len(toks) - 1)
            if toks[i] = '{w1}' and toks[i+1] = '{w2}'
            and toks[i+2] = '{w3}'])::bigint as n_occ
from t""")
    return (
        "with t as (select doc_id, string_split(coalesce(text, ''), ' ') "
        "as toks from documents)\nselect * from ("
        + " union all ".join(arms)
        + ") where n_occ > 0"
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
    out = orders.join(probe, join_type="left_anti",
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


def user_rfm_oracle_sql() -> str:
    """Replays the integer fold and the three exact-quartile cuts (the
    winsorize row_number order-statistic idiom, 0-based floor((n-1)q))."""
    stats = []
    for col in ("r_days", "f_n", "m_cents"):
        stats.append(f"""
s_{col} as (select {col} as v, row_number() over (order by {col}) - 1
              as r from u),
q_{col} as (select
  (select v from s_{col}, nn where r = ((nn.n - 1) * 1) // 4) as q1,
  (select v from s_{col}, nn where r = ((nn.n - 1) * 2) // 4) as q2,
  (select v from s_{col}, nn where r = ((nn.n - 1) * 3) // 4) as q3)""")
    return f"""
with ref as (select max(epoch_us(ts)) as us from events),
u as (select user_id,
             (ref.us - max(epoch_us(ts))) // {RFM_DAY_US} as r_days,
             count(*)::bigint as f_n,
             sum(floor(value * 100 + 0.5)::bigint)::bigint as m_cents
      from events, ref group by user_id, ref.us),
nn as (select count(*) as n from u),{",".join(stats)}
select u.user_id, u.r_days, u.f_n, u.m_cents,
       (1 + (u.r_days > q_r_days.q1)::int + (u.r_days > q_r_days.q2)::int
          + (u.r_days > q_r_days.q3)::int)::bigint as r_score,
       (1 + (u.f_n > q_f_n.q1)::int + (u.f_n > q_f_n.q2)::int
          + (u.f_n > q_f_n.q3)::int)::bigint as f_score,
       (1 + (u.m_cents > q_m_cents.q1)::int + (u.m_cents > q_m_cents.q2)::int
          + (u.m_cents > q_m_cents.q3)::int)::bigint as m_score
from u, q_r_days, q_f_n, q_m_cents
"""


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
            m.join(
                right,
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
    dw = d.join(deg, join_type="inner", num_partitions=nparts,
                on=("src",)).materialize()
    pairs = dw.join(dw.select_columns(["src", "dst"]),
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
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
        .join(
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


def xlang_mine_oracle_sql() -> str:
    """Replay of q_xlang_mine: cosine at 4 dp scaled to bigint,
    rank by (sim desc, tgt_id asc), margin = K'*best - sum(top-K') in
    integer arithmetic, threshold inclusive."""
    return f"""
with tgt as (
  select e.vec_id as tid, e.embedding as te
  from embeddings e join documents d on d.doc_id = e.vec_id
  where d.lang = '{XLANG_TGT}'),
src as (
  select e.vec_id as sid, e.embedding as se
  from embeddings e join documents d on d.doc_id = e.vec_id
  where d.lang = '{XLANG_SRC}'),
scored as (
  select src.sid, tgt.tid,
         cast(round(round(list_cosine_similarity(src.se::double[],
              tgt.te::double[]), 4) * 10000, 0) as bigint) as s4
  from src cross join tgt),
ranked as (
  select *, row_number() over
      (partition by sid order by s4 desc, tid asc) as rn
  from scored),
agg as (
  select sid,
         max(case when rn = 1 then tid end) as tgt_id,
         max(case when rn = 1 then s4 end) as best_s4,
         count(*) as kk, sum(s4) as sum_s4
  from ranked where rn <= {XLANG_K} group by sid)
select sid as src_id, tgt_id, best_s4 as sim_1e4,
       cast(kk * best_s4 - sum_s4 as bigint) as margin_1e4
from agg where kk * best_s4 - sum_s4 >= {XLANG_TAU_1E4}
"""


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


def topic_tag_oracle_sql() -> str:
    lex_rows = ", ".join(
        f"('{w}', '{t}')"
        for t, ws in sorted(TOPIC_LEXICON.items())
        for w in ws
    )
    return f"""
with lex(word, topic) as (values {lex_rows}),
tok as (
  select doc_id, unnest(string_split(text, ' ')) as word from documents),
hits as (
  select t.doc_id, l.topic, count(*)::bigint as n
  from tok t join lex l on l.word = t.word
  group by t.doc_id, l.topic),
best as (
  select doc_id, topic, n, row_number() over
      (partition by doc_id order by n desc, topic asc) as rn
  from hits)
select d.doc_id,
       coalesce(b.topic, 'none') as topic,
       coalesce(b.n, 0) as hits
from documents d
left join best b on b.doc_id = d.doc_id and b.rn = 1
"""


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


def dom_templates_oracle_sql(pages_dir: str) -> str:
    return f"""
with tg as (
  select url,
         split_part(split_part(url, '://', 2), '/', 1) as host,
         md5(array_to_string(
           regexp_extract_all(decode(html), '<([a-z][a-z0-9]*)', 1),
           '>')) as struct_md5
  from ({_link_pages_sql(pages_dir)}))
select host, struct_md5, count(*)::bigint as n_pages,
       min(url) as sample_url
from tg group by host, struct_md5
"""


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


def ann_recall_oracle_sql(sf_dir: str) -> str:
    """Composes the two existing full replications (brute cosine top-K
    and the plane-literal sign-LSH path) and computes the same per-query
    hit rollup with a left join."""
    return f"""
with brute as ({ORACLES["knn_brute"]}),
ann as ({lsh_oracle_sql(sf_dir)})
select b.query_id,
       count(*)::bigint as k_truth,
       sum(case when a.neighbor_id is not null then 1 else 0 end)::bigint
         as n_hits,
       (sum(case when a.neighbor_id is not null then 1 else 0 end)
          * 1000000 // count(*))::bigint as recall_ppm
from brute b
left join ann a
  on a.query_id = b.query_id and a.neighbor_id = b.neighbor_id
group by b.query_id
"""


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


def bpe_encode_oracle_sql() -> str:
    """Replay of _bpe_learn + q_bpe_encode in SQL: the bpe_train oracle's
    unrolled merge rounds with the WORD carried through each round, a
    final per-word symbol count, and the per-doc rollup (left join: a
    word outside the trained ^[a-z]+$ class counts one token)."""
    rounds = []
    prev = "w0"
    for k in range(1, BPE_MERGES + 1):
        rounds.append(f"""
p{k} as materialized (
  select s[i] || ' ' || s[i + 1] as pair, n
  from (
    select s, n, unnest(generate_series(1, len(s) - 1)) as i
    from (select string_split(substr(spaced, 2, length(spaced) - 2),
                              ')(') as s, n
          from {prev}))),
b{k} as materialized (
  select split_part(pair, ' ', 1) as left_sym,
         split_part(pair, ' ', 2) as right_sym
  from (select pair, sum(n)::bigint as n from p{k} group by pair
        order by n desc, pair limit 1)),
w{k} as materialized (
  select word,
         replace(spaced,
                 '(' || (select left_sym from b{k}) || ')(' ||
                 (select right_sym from b{k}) || ')',
                 '(' || (select left_sym from b{k}) ||
                 (select right_sym from b{k}) || ')') as spaced, n
  from {prev})""")
        prev = f"w{k}"
    return f"""
with words as (
  select w as word, count(*)::bigint as n
  from (select unnest(string_split(text, ' ')) as w from documents)
  where regexp_matches(w, '^[a-z]+$')
  group by w),
w0 as materialized (
  select word, '(' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substr(word, i, 1)), ')(')
         || ')(</w>)' as spaced, n
  from words),{",".join(rounds)},
enc as (
  select word,
         len(string_split(substr(spaced, 2, length(spaced) - 2),
                          ')('))::bigint as n_sym
  from {prev}),
tok as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w
        from documents)
  where w <> '')
select t.doc_id, count(*)::bigint as n_words,
       sum(case when e.word is not null then e.n_sym else 1 end)::bigint
         as n_bpe_tokens
from tok t left join enc e on e.word = t.w
group by t.doc_id
"""


# ---------------------------------------------------------------------------
# registry + oracles
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# session 16: global-statistics + broadcast-search operators
# ---------------------------------------------------------------------------


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


def event_stationary_oracle_sql() -> str:
    """Unrolled replay of the fixed-point power iteration (materialized
    round CTEs; the correlated per-state subquery runs over the tiny
    O(types²) transition table)."""
    rounds = []
    prev = "p0"
    for k in range(1, EV_STAT_ITERS + 1):
        rounds.append(f"""
p{k} as materialized (
  select s.t,
         coalesce((select sum((pp.p * tr.n) // tt.tot)
                   from tr join tot tt using (prev_type)
                   join {prev} pp on pp.t = tr.prev_type
                   where tr.next_type = s.t), 0)::bigint as p
  from states s)""")
        prev = f"p{k}"
    return f"""
with tr as materialized ({ORACLES["event_transitions"]}),
states as materialized (
  select prev_type as t from tr union select next_type from tr),
tot as materialized (
  select prev_type, sum(n)::bigint as tot from tr group by prev_type),
ns as (select count(*) as n from states),
p0 as (select t, ({EV_STAT_SCALE} // ns.n)::bigint as p
       from states, ns),{",".join(rounds)}
select t as event_type, (p // 1000000)::bigint as stationary_micro
from {prev}
"""


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
DAY_US = 86_400_000_000


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


def event_entropy_oracle_sql() -> str:
    return f"""
with tr as ({ORACLES["event_transitions"]}),
tot as (select prev_type, sum(n)::bigint as tot from tr group by 1)
select t.prev_type, tot.tot as n_out,
       round(ln(tot.tot::double)
             - sum(t.n::double * ln(t.n::double)) / tot.tot::double, 6)
         as entropy_nats
from tr t join tot using (prev_type)
group by t.prev_type, tot.tot
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
    ja = und.join(deg, join_type="inner", num_partitions=nparts,
                  on=("a",), right_on=("node",))
    jb = ja.join(deg, join_type="inner", num_partitions=nparts,
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


def assortativity_oracle_sql(pages_dir: str) -> str:
    return f"""
with e as ({outlinks_oracle_sql(pages_dir)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from e where src <> dst),
deg as (select node, count(*)::bigint as deg from (
          select a as node from und union all select b from und)
        group by node),
j as (select da.deg as x, db.deg as y
      from und join deg da on da.node = und.a
      join deg db on db.node = und.b),
m as (select (2 * count(*))::hugeint as m,
             (sum(x) + sum(y))::hugeint as sx,
             (sum(x * x) + sum(y * y))::hugeint as sxx,
             (2 * sum(x * y))::hugeint as sxy
      from j)
select (m // 2)::bigint as n_edges,
       case when m * sxx - sx * sx = 0 then 0.0
            else round((m * sxy - sx * sx)::double
                       / (m * sxx - sx * sx)::double, 6) end
         as assortativity
from m
"""


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


def pca_oracle_sql(sf_dir: str) -> str:
    """Composes the embed_pca oracle: recompute mean + top eigenvector
    INDEPENDENTLY (one-shot numpy over the raw parquet — no shared code
    path with the distributed reduction), embed them as 64 literal
    (pos, v, m) rows, and replay the projection in SQL."""
    import pyarrow.parquet as pq_

    X = np.asarray(
        pq_.read_table(_pq(sf_dir, "embeddings"), columns=["embedding"])[
            "embedding"
        ].to_pylist(),
        dtype=np.float64,
    )
    n = len(X)
    m = X.sum(axis=0) / n
    C = (X.T @ X) / n - np.outer(m, m)
    v = _pca_top_component(C)
    vals = ", ".join(
        f"({i + 1}, {v[i]!r}::double, {m[i]!r}::double)"
        for i in range(EMBED_DIMS)
    )
    return f"""
with w(pos, v, m) as (values {vals}),
flat as (
  select vec_id, unnest(embedding)::double as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings)
select f.vec_id, round(sum((f.val - w.m) * w.v), 6) as pc1
from flat f join w using (pos)
group by f.vec_id
"""


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


EDITDIST_CAP = 200  # chars compared per side (documented truncation)


def _lev_bytes(a: bytes, b: bytes) -> int:
    """Levenshtein distance over BYTE sequences (DuckDB's ``levenshtein``
    is byte-based — 'café' vs 'cafe' is 2 — so the engine matches that
    semantics exactly). Vectorized row-DP: the insertion running-min uses
    the minimum.accumulate trick full[j] = j + min_k≤j(full[k] − k)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b, dtype=np.uint8).astype(np.int32)
    width = np.arange(len(b) + 1, dtype=np.int32)
    prev = width.copy()
    full = np.empty(len(b) + 1, dtype=np.int32)
    for i, ca in enumerate(a):
        full[0] = i + 1
        np.minimum(prev[:-1] + (bb != ca), prev[1:] + 1, out=full[1:])
        adj = full - width
        np.minimum.accumulate(adj, out=adj)
        full = adj + width
        prev, full = full, prev
    return int(prev[-1])


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
    joined = rows.join(
        winners, join_type="inner",
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


def first_seen_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url, warc_ts, md5(coalesce(text, '')) as fp
  from read_parquet('{pages_dir}/*.parquet')),
m as (select fp, min(warc_ts) as first_ts, count(*)::bigint as n_captures
      from p group by fp)
select m.fp, m.first_ts, min(p.url) as canonical_url, m.n_captures
from m join p on p.fp = m.fp and p.warc_ts = m.first_ts
group by m.fp, m.first_ts, m.n_captures
"""


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


def markov_perplexity_oracle_sql() -> str:
    return f"""
with tr as ({ORACLES["event_transitions"]}),
tot as (select prev_type, sum(n)::bigint as tot from tr group by 1),
w as (select user_id, event_type as b,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as a
      from events),
p as (select user_id, a, b, count(*)::bigint as c from w
      where a is not null group by 1, 2, 3),
j as (select p.user_id, p.c,
             ln(tot.tot::double) - ln(tr.n::double) as term
      from p join tr on tr.prev_type = p.a and tr.next_type = p.b
      join tot on tot.prev_type = p.a)
select user_id, sum(c)::bigint as n_transitions,
       round(sum(c * term), 6) as nll_nats,
       round(sum(c * term) / sum(c), 6) as avg_nll
from j group by user_id
"""


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


def rowgroup_prune_oracle_sql(path: str) -> str:
    return f"""
select row_group_id::bigint as row_group_id,
       row_group_num_rows::bigint as n_rows,
       stats_min_value::bigint as min_n_chars,
       stats_max_value::bigint as max_n_chars,
       (stats_max_value::bigint <= {PRUNE_NCHARS})::bigint as prunable
from parquet_metadata('{path}')
where path_in_schema = 'n_chars'
"""


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


def csv_roundtrip_oracle_sql(path: str) -> str:
    return f"""
select doc_id::bigint as doc_id, source, lang,
       n_chars::bigint as n_chars,
       (n_chars // 100)::bigint as len_bucket
from read_csv_auto('{path}', header=true)
"""


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


# ---------------------------------------------------------------------------
# session 19 (round 4): PII scan / redact / gate over an injected fixture
# ---------------------------------------------------------------------------

# RE2 patterns shared verbatim by the Arrow kernels and the DuckDB
# oracles (both engines are RE2, so semantics are identical — the
# textnorm RE2-vectorized precedent). The four classes are mutually
# non-overlapping by construction: distinct digit-group shapes
# (3-3-4 phone vs 3-2-4 ssn), dotted-vs-dashed separators, and the
# mandatory alpha TLD in email.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def pii_corpus() -> str:
    """Lazily write the deterministic PII fixture (sf-independent fixed
    path); both the Ray queries and the oracle composers call this, so
    either side can run first."""
    import tempfile

    from ..sources.synthetic import write_pii_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_pii_400")
    return write_pii_corpus(root, n=400, seed=1)


def q_pii_scan(sf_dir: str):
    """Per-document PII inventory — the compliance pass every
    training-data pipeline runs before release (emails, phone numbers,
    IPv4 addresses, SSN-like ids). One embarrassingly-parallel
    map_batches over the text column; counts via Arrow's RE2
    ``count_substring_regex`` kernels (vectorized, zero Python per
    row), no shuffle. At 10^12 docs this is a pure streaming scan whose
    output is 5 ints/doc."""
    ds = rd.read_parquet(pii_corpus())

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        ne = pc.count_substring_regex(txt, pattern=PII_EMAIL_RE)
        np_ = pc.count_substring_regex(txt, pattern=PII_PHONE_RE)
        ni = pc.count_substring_regex(txt, pattern=PII_IPV4_RE)
        ns = pc.count_substring_regex(txt, pattern=PII_SSN_RE)
        tot = pc.add(pc.add(ne, np_), pc.add(ni, ns))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_email": pc.cast(ne, pa.int64()),
                "n_phone": pc.cast(np_, pa.int64()),
                "n_ipv4": pc.cast(ni, pa.int64()),
                "n_ssn": pc.cast(ns, pa.int64()),
                "n_pii": pc.cast(tot, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def pii_scan_oracle_sql(docs_dir: str) -> str:
    return f"""
select doc_id,
       length(regexp_extract_all(text, '{PII_EMAIL_RE}'))::bigint as n_email,
       length(regexp_extract_all(text, '{PII_PHONE_RE}'))::bigint as n_phone,
       length(regexp_extract_all(text, '{PII_IPV4_RE}'))::bigint as n_ipv4,
       length(regexp_extract_all(text, '{PII_SSN_RE}'))::bigint as n_ssn,
       (length(regexp_extract_all(text, '{PII_EMAIL_RE}'))
        + length(regexp_extract_all(text, '{PII_PHONE_RE}'))
        + length(regexp_extract_all(text, '{PII_IPV4_RE}'))
        + length(regexp_extract_all(text, '{PII_SSN_RE}')))::bigint as n_pii
from read_parquet('{docs_dir}/*.parquet')
"""


def q_pii_scrub(sf_dir: str):
    """PII redaction: every match replaced by a typed placeholder
    ([EMAIL]/[SSN]/[PHONE]/[IP]) in a FIXED class order (placeholders
    contain no digits, so later passes can never re-match earlier
    replacements). Vectorized RE2 ``replace_substring_regex`` chain,
    stateless, no shuffle — the release-time sibling of q_pii_scan."""
    ds = rd.read_parquet(pii_corpus())

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        txt = pc.replace_substring_regex(
            txt, pattern=PII_EMAIL_RE, replacement="[EMAIL]"
        )
        txt = pc.replace_substring_regex(
            txt, pattern=PII_SSN_RE, replacement="[SSN]"
        )
        txt = pc.replace_substring_regex(
            txt, pattern=PII_PHONE_RE, replacement="[PHONE]"
        )
        txt = pc.replace_substring_regex(
            txt, pattern=PII_IPV4_RE, replacement="[IP]"
        )
        return pa.table({"doc_id": t["doc_id"], "text_redacted": txt})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def pii_scrub_oracle_sql(docs_dir: str) -> str:
    return f"""
select doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
             '{PII_SSN_RE}', '[SSN]', 'g'),
           '{PII_PHONE_RE}', '[PHONE]', 'g'),
         '{PII_IPV4_RE}', '[IP]', 'g') as text_redacted
from read_parquet('{docs_dir}/*.parquet')
"""


def q_pii_gate(sf_dir: str):
    """Strict PII gate: only documents with ZERO matches in every class
    survive (the conservative release policy; redaction is the lossy
    alternative). Single stateless filter pass — the mask is the
    conjunction of four vectorized RE2 ``match_substring_regex``
    kernels, cheaper than counting."""
    ds = rd.read_parquet(pii_corpus())

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        dirty = pc.or_(
            pc.or_(
                pc.match_substring_regex(txt, pattern=PII_EMAIL_RE),
                pc.match_substring_regex(txt, pattern=PII_PHONE_RE),
            ),
            pc.or_(
                pc.match_substring_regex(txt, pattern=PII_IPV4_RE),
                pc.match_substring_regex(txt, pattern=PII_SSN_RE),
            ),
        )
        return t.filter(pc.invert(dirty))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def pii_gate_oracle_sql(docs_dir: str) -> str:
    return f"""
select doc_id, text
from read_parquet('{docs_dir}/*.parquet')
where not regexp_matches(text, '{PII_EMAIL_RE}')
  and not regexp_matches(text, '{PII_PHONE_RE}')
  and not regexp_matches(text, '{PII_IPV4_RE}')
  and not regexp_matches(text, '{PII_SSN_RE}')
"""


BITEXT_K = 4  # neighborhood size for the margin denominator


def _bitext_blocks(sf_dir: str, parity: int) -> list:
    """Stream one side of the embedding table into bounded plasma
    blocks (ids, pre-normalized matrix) — the knn_graph round-4 memory
    shape: the driver holds one block at a time, never the table."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    refs = []
    for qb in ds.iter_batches(
        batch_size=KNNG_QBLOCK, batch_format="pyarrow"
    ):
        lab = np.asarray(qb["label"].to_pylist(), dtype=np.int64)
        keep = lab % 2 == parity
        if not keep.any():
            continue
        ids = np.asarray(qb["vec_id"].to_pylist(), dtype=np.int64)[keep]
        M = np.asarray(
            qb["embedding"].to_pylist(), dtype=np.float64
        )[keep]
        M = M / np.maximum(
            np.linalg.norm(M, axis=1, keepdims=True), 1e-12
        )
        refs.append(ray.put((ids, M)))
    return refs


def _sim4(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    """Cosine sims of pre-normalized rows, rounded 4 dp, as int e4 —
    the integer currency every comparison below uses."""
    return np.rint(np.round(X @ Y.T, 4) * 10_000).astype(np.int64)


def _merge_topk(
    sims_blocks: list, ids_blocks: list, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Row-wise global top-k by (sim desc, id asc) across per-block
    score matrices. Returns (vals, ids) of shape (rows, k)."""
    allv = np.concatenate(sims_blocks, axis=1)
    alli = np.concatenate(ids_blocks)
    order = np.argsort(alli, kind="stable")
    allv = allv[:, order]
    alli = alli[order]
    top = np.argsort(-allv, axis=1, kind="stable")[:, :k]
    rows = np.arange(allv.shape[0])[:, None]
    return allv[rows, top], alli[top]


def q_bitext_mine(sf_dir: str):
    """Margin-based bitext mining, RATIO criterion with BOTH-side
    neighborhoods (Artetxe & Schwenk, ACL'19 eq. 4 — the CCMatrix
    recipe; `q_xlang_mine` is the simpler forward-difference variant
    against a bounded target side): side A = even-label vectors, side
    B = odd-label (the two-"language" split of the fixture); for each
    x in A, among its BITEXT_K cosine-nearest candidates y in B, pick
    the one maximizing margin(x,y) = cos(x,y) / ((mean_k cos(x,
    NN_B(x)) + mean_k cos(y, NN_A(y)))/2), keep pairs with margin > 1
    — the published recipe's candidate restriction.
    ENTIRELY integer-exact once cosines are rounded at 4 dp (the
    knn_brute precedent): sims become int e4, denominators are top-k
    SUMS (no float means), the per-x argmax and the >1 filter are
    integer cross-multiplies — identical to the SQL replay by
    construction.

    Memory shape: both sides stream into bounded plasma blocks
    (no driver table read — the knn_graph round-4 fix); actors loop
    zero-copy over B blocks per batch. The B-side denominator table
    (one int per B vector) is built once per actor from the block
    refs; at 10^12 vectors that table and the exact scans are replaced
    by the IVF route (q_knn_ivf's bucketed index) feeding the same
    margin arithmetic — the margin math is the operator, neighbor
    retrieval is pluggable."""
    a_refs = _bitext_blocks(sf_dir, 0)
    b_refs = _bitext_blocks(sf_dir, 1)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    class Miner:
        def __init__(self, a_refs, b_refs, k: int):
            self.b_refs = list(b_refs)
            self.k = k
            # B-side denominators: per y, sum of top-k sims vs A
            # (selected (sim desc, A-id asc)) — one int per B vector,
            # built by a bounded block x block loop (zero-copy gets)
            self.mysum: dict[int, int] = {}
            for bref in self.b_refs:
                b_ids, B = ray.get(bref)
                sims_blocks, ids_blocks = [], []
                for aref in a_refs:
                    a_ids, A = ray.get(aref)
                    sims_blocks.append(_sim4(B, A))
                    ids_blocks.append(a_ids)
                vals, _ = _merge_topk(sims_blocks, ids_blocks, k)
                for yi, y in enumerate(b_ids):
                    self.mysum[int(y)] = int(vals[yi].sum())

        def __call__(self, batch: pa.Table) -> pa.Table:
            lab = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
            keep = lab % 2 == 0
            empty = pa.table(
                {
                    "src_id": pa.array([], pa.int64()),
                    "dst_id": pa.array([], pa.int64()),
                    "sim_e4": pa.array([], pa.int64()),
                    "den_e4": pa.array([], pa.int64()),
                }
            )
            if not keep.any() or not self.b_refs:
                return empty
            x_ids = np.asarray(
                batch["vec_id"].to_pylist(), dtype=np.int64
            )[keep]
            X = np.asarray(
                batch["embedding"].to_pylist(), dtype=np.float64
            )[keep]
            X = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12
            )
            sims_blocks, ids_blocks = [], []
            for bref in self.b_refs:
                b_ids, B = ray.get(bref)  # zero-copy plasma view
                sims_blocks.append(_sim4(X, B))
                ids_blocks.append(b_ids)
            vals, cids = _merge_topk(
                sims_blocks, ids_blocks, self.k
            )  # (x, k) candidate sims + B ids
            mxsum = vals.sum(axis=1)
            src, dst, s4, d4 = [], [], [], []
            for xi in range(vals.shape[0]):
                best = None
                for j in range(vals.shape[1]):
                    num = int(vals[xi, j])
                    den = int(mxsum[xi]) + self.mysum[int(cids[xi, j])]
                    if best is None:
                        best = (num, den, int(cids[xi, j]))
                        continue
                    lhs = num * best[1]
                    rhs = best[0] * den
                    if lhs > rhs or (
                        lhs == rhs and int(cids[xi, j]) < best[2]
                    ):
                        best = (num, den, int(cids[xi, j]))
                # margin > 1  <=>  2k * num > den (integers)
                if best and 2 * self.k * best[0] > best[1]:
                    src.append(int(x_ids[xi]))
                    dst.append(best[2])
                    s4.append(best[0])
                    d4.append(best[1])
            return pa.table(
                {
                    "src_id": pa.array(src, pa.int64()),
                    "dst_id": pa.array(dst, pa.int64()),
                    "sim_e4": pa.array(s4, pa.int64()),
                    "den_e4": pa.array(d4, pa.int64()),
                }
            )

    return ds.map_batches(
        Miner, fn_constructor_args=(a_refs, b_refs, BITEXT_K),
        batch_format="pyarrow", concurrency=_apool(), max_restarts=0,
    )


BITEXT_ORACLE_SQL = f"""
with a as (select vec_id, embedding from embeddings where label % 2 = 0),
b as (select vec_id, embedding from embeddings where label % 2 = 1),
s as (select a.vec_id as xa, b.vec_id as yb,
             cast(round(round(list_cosine_similarity(
                    a.embedding::double[], b.embedding::double[]), 4)
                  * 10000) as bigint) as sim4
      from a cross join b),
mx as (select xa, sum(sim4)::bigint as mxsum from (
         select xa, sim4, row_number() over
             (partition by xa order by sim4 desc, yb asc) as rn
         from s) where rn <= {BITEXT_K} group by xa),
my as (select yb, sum(sim4)::bigint as mysum from (
         select yb, sim4, row_number() over
             (partition by yb order by sim4 desc, xa asc) as rn
         from s) where rn <= {BITEXT_K} group by yb),
cand as (select xa, yb, sim4 from (
           select xa, yb, sim4, row_number() over
               (partition by xa order by sim4 desc, yb asc) as rn
           from s) where rn <= {BITEXT_K}),
j as (select c.xa, c.yb, c.sim4,
             (mx.mxsum + my.mysum)::bigint as den4
      from cand c join mx using (xa) join my using (yb)),
best as (select j.xa, j.yb, j.sim4, j.den4 from j
         where not exists (
           select 1 from j j2 where j2.xa = j.xa and
             (j2.sim4 * j.den4 > j.sim4 * j2.den4 or
              (j2.sim4 * j.den4 = j.sim4 * j2.den4
               and j2.yb < j.yb))))
select xa as src_id, yb as dst_id, sim4 as sim_e4, den4 as den_e4
from best where 2 * {BITEXT_K} * sim4 > den4
"""


def q_leakage_free_split(sf_dir: str):
    """Leakage-free train/test split: the deterministic md5 split
    (`split_assign`) hardened by NEAR-DUP leakage removal — any
    non-test document that is an exact-verified near-duplicate
    (`setsim_join`, complete at threshold by the prefix-filter
    guarantee) of a test document is re-labeled 'dropped', because
    training on a near-copy of an eval item is contamination that
    id-level splitting cannot see. The published eval-hygiene step
    (GPT-3 appendix C / PaLM dedup-against-eval discipline) as one
    dataflow: split pass (stateless) -> verified pair edges (both
    directions) -> hash-join edges against the test side -> distinct
    flagged neighbors (per-batch Arrow unique + grouped count, never a
    per-node Python group) -> one semi-join to mark, one anti-join to
    keep. Everything keyed by doc_id — well-spread at 10^12 docs."""
    nparts = dd.adaptive_partitions(_table_rows(sf_dir, "documents"))
    split = q_split_assign(sf_dir).select_columns(
        ["doc_id", "split"]
    ).materialize()
    pairs = q_setsim_join(sf_dir).select_columns(["a", "b"])

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.concat_arrays(
                    [
                        pc.cast(t["a"], pa.int64()).combine_chunks(),
                        pc.cast(t["b"], pa.int64()).combine_chunks(),
                    ]
                ),
                "v": pa.concat_arrays(
                    [
                        pc.cast(t["b"], pa.int64()).combine_chunks(),
                        pc.cast(t["a"], pa.int64()).combine_chunks(),
                    ]
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    test_side = split.filter(expr="split == 'test'").map_batches(
        lambda t: pa.table({"v": t["doc_id"]}),
        batch_format="pyarrow",
    )
    flagged = (
        edges.join(test_side, join_type="inner",
                   num_partitions=nparts, on=("v",))
        .map_batches(
            lambda t: pa.table(
                {"doc_id": pc.unique(t["u"].combine_chunks())}
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(ray.data.aggregate.Count(alias_name="n_adj"))
        .select_columns(["doc_id"])
    )
    dropped = (
        split.filter(expr="split != 'test'")
        .join(flagged, join_type="inner",
              num_partitions=nparts, on=("doc_id",))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "split": pa.array(
                        ["dropped"] * t.num_rows, pa.string()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    kept = split.join(
        dropped.select_columns(["doc_id"]), join_type="left_anti",
        num_partitions=nparts, on=("doc_id",),
    )
    return kept.union(dropped)


def leakage_free_split_oracle_sql() -> str:
    return f"""
with pr as ({_setsim_oracle_sql()}),
sall as ({SPLIT_ASSIGN_SQL}),
s as (select doc_id, split from sall),
e as (select a as u, b as v from pr union select b, a from pr),
flag as (select distinct e.u as doc_id
         from e join s sv on sv.doc_id = e.v and sv.split = 'test')
select s.doc_id,
       case when s.split <> 'test' and f.doc_id is not null
            then 'dropped' else s.split end as split
from s left join flag f using (doc_id)
"""


# ---------------------------------------------------------------------------
# session 20: time-travel snapshot read, politeness scheduling, quality
# rule ensemble
# ---------------------------------------------------------------------------

SNAPSHOT_ASOF_TS = "2024-01-02 12:00:00"  # between revision 0 and 1


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


def snapshot_asof_oracle_sql(pages_dir: str) -> str:
    return f"""
select url, warc_ts, text from (
  select url, warc_ts, text,
         row_number() over (partition by url
                            order by warc_ts desc) as rn
  from read_parquet('{pages_dir}/*.parquet')
  where warc_ts <= timestamp '{SNAPSHOT_ASOF_TS}')
where rn = 1
"""


CRAWL_DELAY_S = 5  # per-host politeness delay between fetches


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


def crawl_schedule_oracle_sql(pages_dir: str) -> str:
    return f"""
select host, url, rn as fetch_rank,
       (rn - 1) * {CRAWL_DELAY_S} as fetch_offset_s
from (
  select regexp_replace(url, '^https?://([^/]+)/.*$', '\\1') as host,
         url,
         row_number() over (
           partition by regexp_replace(url, '^https?://([^/]+)/.*$',
                                       '\\1')
           order by length(text) desc, url asc) as rn
  from read_parquet('{pages_dir}/*.parquet'))
"""


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
    under = pairs.join(
        df, join_type="inner", num_partitions=nparts, on=("term",),
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


def link_density_oracle_sql(pages_dir: str) -> str:
    return f"""
with m as (
  select url,
         coalesce(list_sum(list_transform(
           regexp_extract_all(decode(html), '<p>([^<]*)</p>', 1),
           x -> length(x))), 0)::bigint as content_chars,
         coalesce(list_sum(list_transform(
           regexp_extract_all(decode(html),
                              '<a href="[^"]*">([^<]*)</a>', 1),
           x -> length(x))), 0)::bigint as anchor_chars
  from read_parquet('{pages_dir}/*.parquet'))
select url, content_chars, anchor_chars,
       case when content_chars + anchor_chars > 0
            then anchor_chars * 1000000
                 // (content_chars + anchor_chars)
            else 0 end as link_density_ppm,
       (case when content_chars + anchor_chars > 0
             then anchor_chars * 1000000
                  // (content_chars + anchor_chars)
             else 0 end >= {LINKDENS_BOILER_PPM})::bigint
         as is_boilerplate
from m
"""


# ---------------------------------------------------------------------------
# session 22: outer join / pattern mining / sampled quantiles /
# record linkage (blocking + sorted-neighborhood)
# ---------------------------------------------------------------------------


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


JOIN_OUTER_SQL = """
with e as (
  select user_id as key, count(*)::bigint as n_events
  from events group by 1),
o as (
  select o_custkey as key, count(*)::bigint as n_orders,
         sum(o_totalprice) as total_price
  from orders group by 1)
select coalesce(e.key, o.key) as key,
       coalesce(e.n_events, 0)::bigint as n_events,
       coalesce(o.n_orders, 0)::bigint as n_orders,
       round(coalesce(o.total_price, 0.0), 2) as total_price,
       case when e.key is not null and o.key is not null then 'both'
            when e.key is null then 'orders_only'
            else 'events_only' end as side
from e full outer join o on e.key = o.key
"""


# minimum co-occurrence count for a part pair to be a frequent itemset
FREQ_MIN_SUPPORT = 3
# power-of-two bucket count for the itemset self-join (same role as
# JOIN_BUCKETS in q_join_bucketed)
FREQ_BUCKETS = 64


def q_freq_itemsets(sf_dir: str):
    """Frequent 2-itemset mining (co-purchased part pairs with support
    >= FREQ_MIN_SUPPORT) — the market-basket / co-occurrence primitive
    (Apriori's first real level). Pair generation is a bucketed SELF-join
    on the basket key: lineitems co-locate by hash(orderkey) % B, each
    bucket self-merges vectorized in pandas (fan-out bounded by the
    per-order line cap, so a bucket's pair count is ~linear in its
    rows), dedups (order, a, b), and pre-counts pairs LOCALLY — the
    combiner — so the global groupby((a, b)).Sum shuffles one row per
    distinct pair per bucket, never the pair instances. Skewed baskets
    (one order with 10^5 items) would need the same star-collapse cap
    the LSH bucket pairing uses; TPC-H baskets are bounded by
    construction."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def tag(t: pa.Table) -> pa.Table:
        b = pc.bit_wise_and(t["l_orderkey"], FREQ_BUCKETS - 1)
        return pa.table(
            {
                "bucket": pc.cast(b, pa.int64()),
                "okey": pc.cast(t["l_orderkey"], pa.int64()),
                "part": pc.cast(t["l_partkey"], pa.int64()),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="okey")
        m = m[m["part_x"] < m["part_y"]]
        if m.empty:
            return pd.DataFrame(
                {"part_a": pd.Series([], dtype="int64"),
                 "part_b": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        m = m.drop_duplicates(["okey", "part_x", "part_y"])
        out = (
            m.groupby(["part_x", "part_y"], as_index=False)
            .size()
            .rename(columns={"part_x": "part_a", "part_y": "part_b",
                             "size": "n"})
        )
        return out

    partials = (
        li.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    # final pair-count reduce via salted partitions + Arrow C++ group_by
    # (the _grouped_sum_str shape for an INT-PAIR key):
    # Dataset.groupby().aggregate(Sum) combines at Python speed and took
    # 170 s on the ~2M sf0.1 partial pair rows; this pass takes ~2 s.
    n_parts = 64

    def salt(t: pa.Table) -> pa.Table:
        a = pc.cast(t["part_a"], pa.int64())
        p = pc.bit_wise_and(
            pc.add(pc.multiply(a, 2654435761), t["part_b"]), n_parts - 1
        )
        return t.append_column("p", pc.cast(p, pa.int64()))

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # empty salt partition: keep the schema typed
            return pa.table(
                {
                    "part_a": pa.array([], pa.int64()),
                    "part_b": pa.array([], pa.int64()),
                    "support": pa.array([], pa.int64()),
                }
            )
        r = (
            g.select(["part_a", "part_b", "n"])
            .group_by(["part_a", "part_b"])
            .aggregate([("n", "sum")])
        )
        r = r.rename_columns(["part_a", "part_b", "support"])
        r = r.filter(pc.greater_equal(r["support"], FREQ_MIN_SUPPORT))
        return pa.table(
            {
                "part_a": pc.cast(r["part_a"], pa.int64()),
                "part_b": pc.cast(r["part_b"], pa.int64()),
                "support": pc.cast(r["support"], pa.int64()),
            }
        )

    return (
        partials.map_batches(salt, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("p")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


FREQ_ITEMSETS_SQL = f"""
with p as (
  select distinct l1.l_orderkey, l1.l_partkey as a, l2.l_partkey as b
  from lineitem l1
  join lineitem l2
    on l1.l_orderkey = l2.l_orderkey and l1.l_partkey < l2.l_partkey)
select a as part_a, b as part_b, count(*)::bigint as support
from p group by 1, 2
having count(*) >= {FREQ_MIN_SUPPORT}
"""


# keep-rate numerator out of 1000 for the quantile estimation sample
APPROXQ_RATE = 125


def q_approx_quantiles(sf_dir: str):
    """APPROXIMATE global quantiles from a deterministic hash sample —
    the bounded-cost alternative to q_global_quantiles when even the
    value histogram is too wide (high-cardinality doubles, 10^12 rows):
    keep rows with md5(doc_id) mod 1000 < APPROXQ_RATE (reproducible
    across runs/workers — no RNG state), then read EXACT order
    statistics of the sample via the same histogram-of-values plan.
    Sampling error is the standard order-statistic bound (±O(1/√m)
    quantile rank error for sample size m) while shuffle volume drops by
    the sampling factor and stays O(distinct sampled values). The md5
    keep-decision matches the SQL oracle bit-for-bit, so the estimate
    itself is value-verified, not just plausible."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def sample_hist(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        mask = [
            int.from_bytes(_hl.md5(str(i).encode()).digest()[:4], "big")
            % 1000 < APPROXQ_RATE
            for i in ids
        ]
        kept = t.filter(pa.array(mask, pa.bool_()))
        part = kept.select(["n_chars"]).group_by("n_chars").aggregate(
            [([], "count_all")]
        )
        return part.rename_columns(["n_chars", "n"])

    hist = (
        ds.map_batches(sample_hist, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct sampled values)
        .sort_values("n_chars")
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0

    def at(q_num: int, q_den: int) -> int:
        idx = ((n - 1) * q_num) // q_den
        return int(vals[np.searchsorted(cum, idx + 1, side="left")])

    return pa.table(
        {
            "n_sample": pa.array([n], pa.int64()),
            "p50_chars": pa.array([at(1, 2)], pa.int64()),
            "p90_chars": pa.array([at(9, 10)], pa.int64()),
            "p99_chars": pa.array([at(99, 100)], pa.int64()),
        }
    )


APPROX_QUANTILES_SQL = f"""
with s as (
  select n_chars from documents
  where ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger
        % 1000 < {APPROXQ_RATE}),
o as (
  select n_chars, row_number() over (order by n_chars) - 1 as r from s),
n as (select count(*)::bigint as c from s)
select (select c from n) as n_sample,
       (select n_chars from o where r = ((select c - 1 from n) * 1) // 2)
         ::bigint as p50_chars,
       (select n_chars from o where r = ((select c - 1 from n) * 9) // 10)
         ::bigint as p90_chars,
       (select n_chars from o where r = ((select c - 1 from n) * 99) // 100)
         ::bigint as p99_chars
"""


def er_corpus() -> str:
    """Lazily write the deterministic record-linkage fixture (fixed
    sf-independent path); both the Ray queries and the oracle composers
    call this, so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_er_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_er_300")
    return write_er_corpus(root, n_entities=300, seed=1)


# max edit distance for a blocked record pair to count as a match
ER_MAX_DIST = 2
# blocking-skew guard: a (city, prefix) block past this size logs and
# star-collapses exact-duplicate names before pairing (common-name hot
# blocks are the levenshtein analog of the LSH hot bucket)
ER_MAX_BLOCK = 10_000


def q_entity_resolve(sf_dir: str):
    """Record linkage by BLOCKING + edit-distance verification — the
    classic Fellegi-Sunter pipeline shape: normalize (lower), block on
    (city, 2-char name prefix) so candidate generation is a bounded
    per-block self-pairing instead of the O(n²) cross product, verify
    each candidate with byte-Levenshtein (DuckDB semantics, same
    ``_lev_bytes`` DP as the dedup verifiers), and emit pairs with
    dist <= ER_MAX_DIST plus the phone-agreement flag a downstream
    scorer would weight. ONE groupby on the block key; per-block pair
    loops are quadratic only in the block size, and a hot block (one
    city's most common name prefix) past ER_MAX_BLOCK logs — the
    production refinement is a second blocking key (phone prefix), the
    same salting story as the LSH hot-bucket cap."""
    rec = rd.read_parquet(er_corpus())

    def prep(t: pa.Table) -> pa.Table:
        nn = pc.utf8_lower(t["name"])
        bk = pc.binary_join_element_wise(
            t["city"], pc.utf8_slice_codeunits(nn, 0, 2), "|"
        )
        return pa.table(
            {
                "rec_id": pc.cast(t["rec_id"], pa.int64()),
                "nn": nn,
                "phone": t["phone"],
                "bk": bk,
            }
        )

    def pair_block(g: pa.Table) -> pa.Table:
        if len(g) > ER_MAX_BLOCK:
            import logging

            logging.getLogger(__name__).warning(
                "entity_resolve: hot block %s (%d rows) — add a second "
                "blocking key", g["bk"][0].as_py(), len(g)
            )
        order = pc.sort_indices(g["rec_id"])
        g = g.take(order)
        ids = g["rec_id"].to_pylist()
        nns = g["nn"].to_pylist()
        phones = g["phone"].to_pylist()
        a, b, dist, same = [], [], [], []
        for i in range(len(ids)):
            bi = nns[i].encode("utf-8")
            for j in range(i + 1, len(ids)):
                d = _lev_bytes(bi, nns[j].encode("utf-8"))
                if d <= ER_MAX_DIST:
                    a.append(ids[i])
                    b.append(ids[j])
                    dist.append(d)
                    same.append(1 if phones[i] == phones[j] else 0)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
                "same_phone": pa.array(same, pa.int64()),
            }
        )

    return (
        rec.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bk")
        .map_groups(pair_block, batch_format="pyarrow")
    )


def entity_resolve_oracle_sql(rec_dir: str) -> str:
    return f"""
with r as (
  select rec_id, lower(name) as nn, city, phone
  from read_parquet('{rec_dir}/*.parquet')),
b as (
  select rec_id, nn, phone, city || '|' || substr(nn, 1, 2) as bk from r)
select x.rec_id as a, y.rec_id as b,
       levenshtein(x.nn, y.nn)::bigint as dist,
       (x.phone = y.phone)::bigint as same_phone
from b x join b y on x.bk = y.bk and x.rec_id < y.rec_id
where levenshtein(x.nn, y.nn) <= {ER_MAX_DIST}
"""


# sorted-neighborhood window size (pairs with rank gap < SNM_WINDOW)
SNM_WINDOW = 4


def q_snm_pairs(sf_dir: str):
    """Sorted-Neighborhood Method candidate pairs (Hernández-Stolfo):
    rank every record in the GLOBAL (lower(name), rec_id) order, then
    emit all pairs within a rank window of SNM_WINDOW — the complement
    of key blocking that survives first-character typos, since near
    spellings sort near each other regardless of any block key. The
    global rank reuses q_global_rank's no-global-sort decomposition
    (per-key counts -> driver cumsum of base offsets -> per-group
    enumeration; the offset table is O(distinct names) — past driver
    scale the same shape runs as a bucketed distributed prefix sum, cf.
    pack_sequences). Windowing without overlap primitives: each ranked
    row lands in window buckets r//w and r//w + 1, and a pair (ri < rj,
    rj - ri < w) is generated exactly once, in bucket ri//w + 1 — both
    rows are always co-located there, group size is bounded by 2w."""
    rec = rd.read_parquet(er_corpus())

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rec_id": pc.cast(t["rec_id"], pa.int64()),
                "nn": pc.utf8_lower(t["name"]),
            }
        )

    prepped = rec.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        prepped.groupby("nn")
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )  # O(distinct names)
    base: dict[str, int] = {}
    cum = 0
    for r in sorted(counts, key=lambda r: r["nn"]):
        base[r["nn"]] = cum
        cum += r["n"]
    bref = ray.put(base)

    def rank_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["rec_id"]))
        start = offsets[g["nn"][0].as_py()]
        rnk = pa.array(range(start, start + len(g)), pa.int64())
        w1 = pc.divide(rnk, pa.scalar(SNM_WINDOW, pa.int64()))
        out = pa.table({"rec_id": g["rec_id"], "rnk": rnk, "wb": w1})
        out2 = out.set_column(
            2, "wb", pc.add(w1, pa.scalar(1, pa.int64()))
        )
        return pa.concat_tables([out, out2])

    ranked = prepped.groupby("nn").map_groups(
        rank_group, batch_format="pyarrow"
    )

    def window_pairs(g: pa.Table) -> pa.Table:
        wb = g["wb"][0].as_py()
        g = g.take(pc.sort_indices(g["rnk"]))
        ids = g["rec_id"].to_pylist()
        rnks = g["rnk"].to_pylist()
        a, b, gap = [], [], []
        for i in range(len(ids)):
            if rnks[i] // SNM_WINDOW + 1 != wb:
                continue  # this pair belongs to the other bucket copy
            for j in range(i + 1, len(ids)):
                d = rnks[j] - rnks[i]
                if d >= SNM_WINDOW:
                    break
                a.append(ids[i])
                b.append(ids[j])
                gap.append(d)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "gap": pa.array(gap, pa.int64()),
            }
        )

    return ranked.groupby("wb").map_groups(
        window_pairs, batch_format="pyarrow"
    )


def snm_pairs_oracle_sql(rec_dir: str) -> str:
    return f"""
with r as (
  select rec_id, lower(name) as nn from read_parquet('{rec_dir}/*.parquet')),
o as (
  select rec_id,
         row_number() over (order by nn, rec_id) - 1 as rnk
  from r)
select x.rec_id as a, y.rec_id as b, (y.rnk - x.rnk)::bigint as gap
from o x join o y
  on y.rnk - x.rnk between 1 and {SNM_WINDOW - 1}
"""


def struct_corpus() -> str:
    """Lazily write the deterministic structured-HTML fixture (fixed
    sf-independent path); Ray queries and oracle composers both call
    this, so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_struct_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_struct_150")
    return write_struct_corpus(root, n=150, seed=1)


HEADING_RE = re.compile(r"<h([1-3])>([^<]*)</h\1>")


def q_heading_outline(sf_dir: str):
    """Document-structure extraction: the <h1>/<h2>/<h3> outline of
    every page as (url, pos, level, heading) rows in document order —
    the sectioning pass a web-corpus pipeline runs to split long pages
    at semantic boundaries (chunk_windows' structural sibling). One
    embarrassingly-parallel map_batches over the html column, compiled
    RE2-compatible regex per page (the linear content scan every parse
    stage here uses); no shuffle, output is O(headings). At 10^12 docs
    this streams like q_pii_scan."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, poss, lvls, txts = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for k, m in enumerate(HEADING_RE.finditer(h.decode("utf-8"))):
                urls.append(u)
                poss.append(k + 1)
                lvls.append(int(m.group(1)))
                txts.append(m.group(2))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "pos": pa.array(poss, pa.int64()),
                "level": pa.array(lvls, pa.int64()),
                "heading": pa.array(txts, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def heading_outline_oracle_sql(pages_dir: str) -> str:
    return f"""
with h as (
  select url,
         regexp_extract_all(decode(html), '<h([1-3])>', 1) as lvls,
         regexp_extract_all(decode(html),
                            '<h[1-3]>([^<]*)</h[1-3]>', 1) as txts
  from read_parquet('{pages_dir}/*.parquet'))
select url,
       generate_subscripts(lvls, 1)::bigint as pos,
       unnest(lvls)::bigint as level,
       unnest(txts) as heading
from h
"""


TR_RE = re.compile(r"<tr>(.*?)</tr>")
TD_RE = re.compile(r"<td>([^<]*)</td>")


def q_html_tables(sf_dir: str):
    """HTML table extraction: every <td> cell as (url, row_idx, col_idx,
    cell) — the tabular-data recovery pass (web tables are a major
    structured-pretraining source). Two-level linear scan per page
    (rows, then cells within a row) in one stateless map_batches; same
    streaming shape and scale story as q_heading_outline."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, ris, cis, cells = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for ri, tr in enumerate(TR_RE.finditer(h.decode("utf-8"))):
                for ci, td in enumerate(TD_RE.finditer(tr.group(1))):
                    urls.append(u)
                    ris.append(ri + 1)
                    cis.append(ci + 1)
                    cells.append(td.group(1))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "row_idx": pa.array(ris, pa.int64()),
                "col_idx": pa.array(cis, pa.int64()),
                "cell": pa.array(cells, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def html_tables_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url,
         regexp_extract_all(decode(html), '<tr>(.*?)</tr>', 1) as trs
  from read_parquet('{pages_dir}/*.parquet')),
r as (
  select url, generate_subscripts(trs, 1)::bigint as row_idx,
         unnest(trs) as tr
  from p),
x as (
  select url, row_idx,
         regexp_extract_all(tr, '<td>([^<]*)</td>', 1) as cells
  from r)
select url, row_idx,
       generate_subscripts(cells, 1)::bigint as col_idx,
       unnest(cells) as cell
from x
"""


RRF_K = 60  # the standard reciprocal-rank-fusion smoothing constant


def q_rank_fusion(sf_dir: str):
    """Hybrid ranking by Reciprocal Rank Fusion (Cormack et al.): fuse
    the BM25 relevance top-K with a quality-prior top-K (stop_ratio,
    the strongest single column of the quality scorer) into one list by
    score(d) = Σ 1/(RRF_K + rank_i(d)) — the standard way a curation
    pipeline combines lexical retrieval with an orthogonal prior
    without calibrating scores against each other. Both constituent
    rankings are the EXISTING distributed operators (bm25's
    narrow-stats scan + dataset_topk; the quality scan + dataset_topk);
    fusion itself touches 2K constant-size rows on the driver — a
    scale-free final reduce, like every top-K finish here. Scores are
    integer ppm (10^6 // (K + rank)) so the fused order hashes
    identically in SQL."""
    K = BM25_TOPK
    bm = q_bm25_search(sf_dir).take_all()  # <= K rows
    bm_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    from ..stages.topk import dataset_topk

    qual = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(tx.quality_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
        .select_columns(["doc_id", "stop_ratio"])
    )
    qtop = dataset_topk(
        qual,
        sort_keys=[("stop_ratio", "descending"), ("doc_id", "ascending")],
        k=K,
    ).take_all()
    q_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(qtop, key=lambda r: (-r["stop_ratio"], r["doc_id"]))
        )
    }
    ids = sorted(set(bm_rank) | set(q_rank))
    out_id, out_ppm, out_rb, out_rq = [], [], [], []
    for d in ids:
        rb = bm_rank.get(d, 0)
        rq = q_rank.get(d, 0)
        ppm = (1_000_000 // (RRF_K + rb) if rb else 0) + (
            1_000_000 // (RRF_K + rq) if rq else 0
        )
        out_id.append(d)
        out_ppm.append(ppm)
        out_rb.append(rb)
        out_rq.append(rq)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "rrf_ppm": pa.array(out_ppm, pa.int64()),
            "rank_bm25": pa.array(out_rb, pa.int64()),
            "rank_quality": pa.array(out_rq, pa.int64()),
        }
    )


def rank_fusion_oracle_sql() -> str:
    qual_sql = ORACLES["quality_score"]
    return f"""
with bm as ({bm25_oracle_sql()}),
bmr as (
  select doc_id, row_number() over (order by score desc, doc_id) as r
  from bm),
qall as ({qual_sql}),
qtop as (
  select doc_id, stop_ratio from qall
  order by stop_ratio desc, doc_id limit {BM25_TOPK}),
qr as (
  select doc_id,
         row_number() over (order by stop_ratio desc, doc_id) as r
  from qtop),
u as (
  select doc_id, 1000000 // ({RRF_K} + r) as c, r as rb, 0 as rq from bmr
  union all
  select doc_id, 1000000 // ({RRF_K} + r) as c, 0 as rb, r as rq from qr)
select doc_id, sum(c)::bigint as rrf_ppm,
       max(rb)::bigint as rank_bm25, max(rq)::bigint as rank_quality
from u group by doc_id
"""



DATE_ISO_RE = re.compile(r"Published: (\d{4})-(\d{2})-(\d{2})")
DATE_US_RE = re.compile(r"Published: (\d{2})/(\d{2})/(\d{4})")
DATE_TEXT_RE = re.compile(r"Published: ([A-Z][a-z]+) (\d{1,2}), (\d{4})")
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        [
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November",
            "December",
        ]
    )
}


def q_date_extract(sf_dir: str):
    """Publication-date extraction + normalization: recognize the three
    dominant web date shapes (ISO 8601, US slash, long textual) and
    normalize each to the canonical ISO string and epoch-day integer —
    the freshness signal every crawl pipeline attaches before
    recency-weighted sampling (cf. crawl_schedule / decayed_counts).
    Stateless map_batches over the html column, compiled patterns tried
    in fixed precedence; no shuffle, O(1) output per page. The engine's
    calendar arithmetic is value-verified against DuckDB's independent
    strptime/datediff."""
    import datetime as _dtt

    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])
    epoch = _dtt.date(1970, 1, 1)

    def f(t: pa.Table) -> pa.Table:
        urls, fmts, isos, days = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            s = h.decode("utf-8")
            m = DATE_ISO_RE.search(s)
            if m:
                fmt = "iso"
                d = _dtt.date(int(m.group(1)), int(m.group(2)),
                              int(m.group(3)))
            else:
                m = DATE_US_RE.search(s)
                if m:
                    fmt = "us"
                    d = _dtt.date(int(m.group(3)), int(m.group(1)),
                                  int(m.group(2)))
                else:
                    m = DATE_TEXT_RE.search(s)
                    if not m:
                        continue  # undated page: no row, like the oracle
                    fmt = "text"
                    d = _dtt.date(int(m.group(3)), _MONTHS[m.group(1)],
                                  int(m.group(2)))
            urls.append(u)
            fmts.append(fmt)
            isos.append(d.isoformat())
            days.append((d - epoch).days)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                "date_iso": pa.array(isos, pa.string()),
                "epoch_day": pa.array(days, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def date_extract_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url, decode(html) as s
  from read_parquet('{pages_dir}/*.parquet')),
e as (
  select url,
    regexp_extract(s, 'Published: (\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) as iso,
    regexp_extract(s, 'Published: (\\d{{2}}/\\d{{2}}/\\d{{4}})', 1) as us,
    regexp_extract(s, 'Published: ([A-Z][a-z]+ \\d{{1,2}}, \\d{{4}})', 1)
      as tx
  from p),
d as (
  select url,
    case when iso <> '' then 'iso'
         when us <> '' then 'us'
         else 'text' end as fmt,
    case when iso <> '' then strptime(iso, '%Y-%m-%d')
         when us <> '' then strptime(us, '%m/%d/%Y')
         else strptime(tx, '%B %d, %Y') end as dt
  from e
  where iso <> '' or us <> '' or tx <> '')
select url, fmt, strftime(dt, '%Y-%m-%d') as date_iso,
       datediff('day', DATE '1970-01-01', dt::date)::bigint as epoch_day
from d
"""


JSONLD_RE = re.compile(
    r'<script type="application/ld\+json">(.*?)</script>', re.DOTALL
)


def q_jsonld_extract(sf_dir: str):
    """Structured-data (JSON-LD) extraction: pull the embedded
    application/ld+json block out of each page and project the typed
    fields — the schema.org metadata pass that yields clean
    (author, type, length) supervision from web pages. Regex-scoped
    block extraction + stdlib json parse per page in one stateless
    map_batches; malformed or absent blocks drop the row (crawl reality;
    same semantics as the oracle's empty-extract filter). Value-verified
    against DuckDB's independent JSON parser."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, types, authors, wcs = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            m = JSONLD_RE.search(h.decode("utf-8"))
            if not m:
                continue
            try:
                obj = json.loads(m.group(1))
            except ValueError:
                continue
            urls.append(u)
            types.append(str(obj.get("@type", "")))
            authors.append(str(obj.get("author", "")))
            wcs.append(int(obj.get("wordCount", 0)))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "item_type": pa.array(types, pa.string()),
                "author": pa.array(authors, pa.string()),
                "word_count": pa.array(wcs, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def jsonld_extract_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url,
         regexp_extract(decode(html),
           '<script type="application/ld\\+json">(.*?)</script>', 1) as j
  from read_parquet('{pages_dir}/*.parquet'))
select url,
       json_extract_string(j, '$."@type"') as item_type,
       json_extract_string(j, '$.author') as author,
       json_extract(j, '$.wordCount')::bigint as word_count
from p where j <> ''
"""


# hard-negative band: sim in [LO, HI) at 4 dp — above HI is a probable
# near-duplicate (a FALSE negative for contrastive training), below LO
# is an easy negative that contributes no gradient signal
CONTRASTIVE_LO = 0.30
CONTRASTIVE_HI = 0.98
CONTRASTIVE_K = 5


def q_contrastive_pairs(sf_dir: str):
    """Hard-negative mining for contrastive training (the DPR/SimCSE
    data-prep step): for each query vector, the top-K most-similar
    OTHER vectors whose cosine falls inside [LO, HI) — similar enough
    to be hard, not so similar they are near-duplicates (the classic
    false-negative trap; HI is the same boundary embedding_neardup
    flags). Same distributed shape as q_knn_brute: broadcast query
    matrix in the actor constructor, per-batch matmul + band filter +
    partial top-K, final per-query reduce over O(K x blocks) rows.
    Sims are ranked at 4 dp with vec_id tie-break on both sides and the
    value itself is excluded from the output, exactly like knn_brute."""
    qv = _query_vectors(sf_dir)

    class BandedKnn:
        def __init__(self, queries, k: int):
            self.query_ids = np.asarray(queries["ids"], dtype=np.int64)
            self.Q = sim._normalize(
                np.asarray(queries["vecs"], dtype=np.float64)
            )
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            M = sim._normalize(sim.embeddings_matrix(batch, "embedding"))
            sims = np.round(self.Q @ M.T, 4)
            out_q, out_n, out_s = [], [], []
            for qi in range(sims.shape[0]):
                qid = int(self.query_ids[qi])
                cand = [
                    j
                    for j in range(sims.shape[1])
                    if ids[j] != qid
                    and CONTRASTIVE_LO <= sims[qi, j] < CONTRASTIVE_HI
                ]
                cand.sort(key=lambda j: (-sims[qi, j], ids[j]))
                for j in cand[: self.k]:
                    out_q.append(qid)
                    out_n.append(int(ids[j]))
                    out_s.append(float(sims[qi, j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "negative_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        BandedKnn, fn_constructor_args=(qv, CONTRASTIVE_K),
        batch_format="pyarrow", concurrency=_apool(),
    )

    def final(g: pa.Table) -> pa.Table:
        order = sorted(
            range(len(g)),
            key=lambda i: (-g["sim"][i].as_py(), g["negative_id"][i].as_py()),
        )
        keep = order[:CONTRASTIVE_K]
        return pa.table(
            {
                "query_id": pc.take(g["query_id"], pa.array(keep)),
                "negative_id": pc.take(g["negative_id"], pa.array(keep)),
            }
        )

    return partials.groupby("query_id").map_groups(
        final, batch_format="pyarrow"
    )


CONTRASTIVE_SQL = f"""
with q as (select vec_id as qid, embedding as qe from embeddings
           order by vec_id limit {{NQ}}),
scored as (select q.qid, e.vec_id as nid,
                  round(list_cosine_similarity(q.qe::double[],
                        e.embedding::double[]), 4) as sim
           from q cross join embeddings e
           where e.vec_id <> q.qid),
banded as (select * from scored
           where sim >= {CONTRASTIVE_LO} and sim < {CONTRASTIVE_HI}),
ranked as (select *, row_number() over
             (partition by qid order by sim desc, nid asc) as rn
           from banded)
select qid as query_id, nid as negative_id
from ranked where rn <= {CONTRASTIVE_K}
"""



MD_BLOCK_RE = re.compile(r"<(h1|h2|h3|p)>([^<]*)")
_MD_PREFIX = {"h1": "# ", "h2": "## ", "h3": "### ", "p": ""}


def q_html_to_markdown(sf_dir: str):
    """HTML -> Markdown linearization: every block element (h1/h2/h3/p)
    becomes one markdown line in document order — the lossy-but-clean
    text rendering LLM-pretraining pipelines prefer over raw-text
    stripping because heading structure survives as '#' prefixes.
    Single compiled-regex scan per page in a stateless map_batches
    (same streaming shape as q_heading_outline); table cells are
    intentionally excluded (q_html_tables is the structured path for
    those). Output is (url, pos, md)."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, poss, mds = [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for k, m in enumerate(MD_BLOCK_RE.finditer(h.decode("utf-8"))):
                urls.append(u)
                poss.append(k + 1)
                mds.append(_MD_PREFIX[m.group(1)] + m.group(2))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "pos": pa.array(poss, pa.int64()),
                "md": pa.array(mds, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def html_to_markdown_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url,
         regexp_extract_all(decode(html), '<(h1|h2|h3|p)>', 1) as tags,
         regexp_extract_all(decode(html),
                            '<(?:h1|h2|h3|p)>([^<]*)', 1) as txts
  from read_parquet('{pages_dir}/*.parquet')),
e as (
  select url, generate_subscripts(tags, 1)::bigint as pos,
         unnest(tags) as tag, unnest(txts) as txt
  from p)
select url, pos,
       case tag when 'h1' then '# ' || txt
                when 'h2' then '## ' || txt
                when 'h3' then '### ' || txt
                else txt end as md
from e
"""


def q_t_closeness(sf_dir: str):
    """t-closeness audit (Li et al., the third of the privacy trio after
    k_anonymity / l_diversity): for each quasi-identifier group (source)
    the total-variation distance between its sensitive-attribute (lang)
    distribution and the corpus-global one — a group whose language mix
    diverges more than t leaks membership information. Dataflow: ONE
    per-batch (source, lang) pre-count -> grouped Sum (the combiner
    shape: shuffle is O(sources x langs)); the global lang distribution
    is the tiny per-lang rollup of that same table, broadcast as plain
    floats; the per-source finish runs in groupby(source) groups bounded
    by the lang-alphabet size. tv is rounded to 6 dp on both sides."""
    counts = (
        _read(sf_dir, "documents", ["source", "lang"])
        .map_batches(
            lambda t: t.group_by(["source", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "lang", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source", "lang"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .materialize()
    )
    glob = counts.groupby("lang").aggregate(
        ray.data.aggregate.Sum("n", alias_name="n")
    ).take_all()  # O(langs) — the sensitive-attribute alphabet
    total = sum(r["n"] for r in glob)
    q_dist = {r["lang"]: r["n"] / total for r in glob}

    def finish(g: pa.Table) -> pa.Table:
        langs = g["lang"].to_pylist()
        ns = g["n"].to_pylist()
        n_s = sum(ns)
        have = dict(zip(langs, ns))
        tv = 0.5 * sum(
            abs(have.get(lang, 0) / n_s - qd)
            for lang, qd in q_dist.items()
        )
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "n_docs": pa.array([n_s], pa.int64()),
                "tv": pa.array([round(tv, 6)], pa.float64()),
            }
        )

    return counts.groupby("source").map_groups(
        finish, batch_format="pyarrow"
    )


T_CLOSENESS_SQL = """
with c as (
  select source, lang, count(*)::bigint as n
  from documents group by 1, 2),
s as (select source, sum(n)::bigint as n_s from c group by 1),
g as (select lang, sum(n)::bigint as n_g from c group by 1),
t as (select sum(n_g)::bigint as total from g),
full_grid as (
  select s.source, g.lang, s.n_s, g.n_g,
         coalesce(c.n, 0)::bigint as n
  from s cross join g
  left join c on c.source = s.source and c.lang = g.lang)
select source, max(n_s)::bigint as n_docs,
       round(0.5 * sum(abs(n * 1.0 / n_s
                           - n_g * 1.0 / (select total from t))), 6) as tv
from full_grid group by source
"""


SHARD_PLAN_N = 16  # output shards for the write plan


def q_shard_plan(sf_dir: str):
    """Output-shard planning audit: assign every doc its output shard by
    md5(doc_id) mod N and roll up per-shard row/byte totals + id range —
    the pre-write pass that sizes the partitioned, resumable parquet
    layout (one directory per shard; a rerun skips finished shards) and
    verifies the hash assignment is balanced BEFORE a 100 TB write. One
    per-batch partial aggregate per shard -> one O(N)-row grouped
    merge; the doc bytes never shuffle."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        chars = t["n_chars"].to_pylist()
        agg: dict[int, list] = {}
        for i, c in zip(ids, chars):
            sh = (
                int.from_bytes(_hl.md5(str(i).encode()).digest()[:4], "big")
                % SHARD_PLAN_N
            )
            a = agg.setdefault(sh, [0, 0, i, i])
            a[0] += 1
            a[1] += c
            a[2] = min(a[2], i)
            a[3] = max(a[3], i)
        shards = sorted(agg)
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_docs": pa.array([agg[s][0] for s in shards], pa.int64()),
                "total_chars": pa.array(
                    [agg[s][1] for s in shards], pa.int64()
                ),
                "min_doc_id": pa.array(
                    [agg[s][2] for s in shards], pa.int64()
                ),
                "max_doc_id": pa.array(
                    [agg[s][3] for s in shards], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("total_chars", alias_name="total_chars"),
            ray.data.aggregate.Min("min_doc_id", alias_name="min_doc_id"),
            ray.data.aggregate.Max("max_doc_id", alias_name="max_doc_id"),
        )
    )


SHARD_PLAN_SQL = f"""
select (('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger
         % {SHARD_PLAN_N})::bigint as shard,
       count(*)::bigint as n_docs,
       sum(n_chars)::bigint as total_chars,
       min(doc_id)::bigint as min_doc_id,
       max(doc_id)::bigint as max_doc_id
from documents
group by 1
"""



EQUIDEPTH_B = 10  # number of equi-depth bins


def q_equidepth_bins(sf_dir: str):
    """Equi-depth feature binning: assign every doc its B-quantile bin
    of n_chars (SQL ``ntile`` semantics: 1-based, first ``n mod B``
    bins take the extra row) — the discretization step feature
    pipelines run before categorical models or stratified sampling.
    Reuses q_global_rank's no-global-sort decomposition: per-(value,
    id-bucket) counts -> driver cumsum of base offsets (O(distinct
    values x buckets), not rows) -> per-group enumeration; the bin is
    then pure arithmetic floor(rank x B / n) + 1, which reproduces
    ntile's uneven-remainder split exactly. The id-bucket key is
    monotone in doc_id, so (value, bucket, id-within) IS the global
    (value, id) order."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return t.append_column("bucket", pc.cast(b, pa.int64()))

    with_bucket = docs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        with_bucket.groupby(["n_chars", "bucket"])
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )
    base: dict[tuple[int, int], int] = {}
    cum = 0
    for r in sorted(counts, key=lambda r: (r["n_chars"], r["bucket"])):
        base[(r["n_chars"], r["bucket"])] = cum
        cum += r["n"]
    n_total = cum
    bref = ray.put(base)

    def bin_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        start = offsets[(g["n_chars"][0].as_py(), g["bucket"][0].as_py())]
        bins = [
            (start + i) * EQUIDEPTH_B // n_total + 1 for i in range(len(g))
        ]
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_chars": g["n_chars"],
                "bin": pa.array(bins, pa.int64()),
            }
        )

    return with_bucket.groupby(["n_chars", "bucket"]).map_groups(
        bin_group, batch_format="pyarrow"
    )


EQUIDEPTH_SQL = f"""
select doc_id, n_chars,
       ntile({EQUIDEPTH_B}) over (order by n_chars, doc_id)::bigint as bin
from documents
"""


BLOOMJOIN_BITS = 1 << 17
BLOOMJOIN_K = 4


def q_join_bloom_prefilter(sf_dir: str):
    """Bloom-prefiltered join — the shuffle-volume killer for selective
    joins: the small (filtered) build side publishes a 16 KiB Bloom
    filter of its keys; the probe side drops non-members BEFORE the
    join shuffle, so the all-to-all moves only (true matches + the
    tunable false-positive residue) instead of the whole fact table.
    False positives are then removed by the exact bucketed join, so the
    Bloom is pure optimization — the result (urgent-order revenue by
    month) equals the plain join, which is exactly what the oracle
    states. Build: per-batch partial bit positions -> bounded groupby
    (<= BLOOMJOIN_BITS rows) -> driver bit array -> probe-map closure
    (plain value, restart-safe). Probe selectivity is logged."""
    import logging

    import pandas as pd

    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def _positions(keys: np.ndarray) -> np.ndarray:
        """(n, K) Bloom bit positions via vectorized splitmix64 double
        hashing — engine-internal (false positives die in the exact
        join), so the hash needs no SQL twin; the md5 loop this
        replaces was 4.6 s of the op's 4.6 s at sf0.1."""
        x = keys.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        h1 = x >> np.uint64(32)
        h2 = x | np.uint64(1)
        js = np.arange(BLOOMJOIN_K, dtype=np.uint64)
        return (
            (h1[:, None] + js[None, :] * h2[:, None])
            % np.uint64(BLOOMJOIN_BITS)
        ).astype(np.int64)

    def key_positions(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.unique(_positions(keys))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    pos_rows = (
        od.map_batches(key_positions, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("pos")
        .count()
        .take_all()  # <= BLOOMJOIN_BITS rows by construction
    )
    bits = np.zeros(BLOOMJOIN_BITS, dtype=bool)
    bits[[r["pos"] for r in pos_rows]] = True

    def probe(t: pa.Table) -> pa.Table:
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        keep = bits[_positions(keys)].all(axis=1)
        kept = t.filter(pa.array(keep))
        if len(t):
            logging.getLogger(__name__).info(
                "bloom prefilter: kept %d/%d lineitems", len(kept), len(t)
            )
        return kept

    li_f = li.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    # exact bucketed join of the two reduced sides (q_join_bucketed shape)
    def tag_orders(t: pa.Table) -> pa.Table:
        m = pc.strftime(t["o_orderdate"], format="%Y-%m")
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["o_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["o_orderkey"], pa.int64()),
                "month": m,
                "price": pa.nulls(len(t), pa.float64()),
                "disc": pa.nulls(len(t), pa.float64()),
                "side": pa.array(["o"] * len(t), pa.string()),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["l_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["l_orderkey"], pa.int64()),
                "month": pa.nulls(len(t), pa.string()),
                "price": t["l_extendedprice"],
                "disc": t["l_discount"],
                "side": pa.array(["l"] * len(t), pa.string()),
            }
        )

    both = od.map_batches(tag_orders, batch_format="pyarrow").union(
        li_f.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "o"][["key", "month"]]
        right = g[g["side"] == "l"][["key", "price", "disc"]]
        m = left.merge(right, on="key", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"month": pd.Series([], dtype="object"),
                 "rev_micro": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        # integer-cent arithmetic: float Sum order varies with shuffle
        # arrival and flipped a month's 2-dp total vs the oracle; the
        # micro-unit (price-cents x discount-percent) sum is exact and
        # order-free at any scale
        m["rev_micro"] = (m["price"] * 100).round().astype("int64") * (
            100 - (m["disc"] * 100).round().astype("int64")
        )
        out = m.groupby("month", as_index=False).agg(
            rev_micro=("rev_micro", "sum"), n=("rev_micro", "size")
        )
        return out

    agg = (
        both.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("month")
        .aggregate(
            ray.data.aggregate.Sum("rev_micro", alias_name="rev_micro"),
            ray.data.aggregate.Sum("n", alias_name="n_lineitems"),
        )
    )
    df = agg.to_pandas()
    # integer half-up to cents BEFORE the float division: pandas .round
    # is half-to-even, DuckDB round() half-up — a month landing on .xx5
    # flips between them; (micro + 50) // 100 is unambiguous
    df["revenue"] = ((df["rev_micro"] + 50) // 100) / 100.0
    df["n_lineitems"] = df["n_lineitems"].astype("int64")
    return df[["month", "revenue", "n_lineitems"]]


JOIN_BLOOM_SQL = """
select strftime(o_orderdate, '%Y-%m') as month,
       ((sum(cast(round(l_extendedprice * 100) as bigint)
             * (100 - cast(round(l_discount * 100) as bigint))) + 50)
        // 100) / 100.0 as revenue,
       count(*)::bigint as n_lineitems
from orders join lineitem on l_orderkey = o_orderkey
where o_orderpriority = '1-URGENT'
group by 1
"""


def q_entity_clusters(sf_dir: str):
    """Entity consolidation: connected components over the
    record-linkage match graph (q_entity_resolve's dist<=2 pairs) —
    every matched record gets its cluster representative (min rec_id),
    the 'golden record' id a master-data pipeline would merge into.
    Reuses the size-routed components machinery of the dedup chain
    (one union-find task under the small limit, join+groupby-min label
    propagation beyond); the oracle replays the chain with the same
    recursive CTE as the near-dup clusters."""
    pairs = q_entity_resolve(sf_dir).select_columns(["a", "b"])
    cc = dd.connected_components(pairs)
    return cc.map_batches(
        lambda t: t.rename_columns(["rec_id", "rep_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def entity_clusters_oracle_sql(rec_dir: str) -> str:
    return f"""
with pairs as ({entity_resolve_oracle_sql(rec_dir)}),
edges as (select a as src, b as dst from pairs
          union select b, a from pairs)
select node as rec_id, rep_id from (
  with recursive cc(node, reached) as (
    select src, src from edges
    union
    select cc.node, e.dst from cc join edges e on e.src = cc.reached
  )
  select node, min(reached) as rep_id from cc group by node
)
"""



_DOMAIN_RE = re.compile(r"https://([^/]+)/")
_PAGE_ID_RE = re.compile(r"p(\d+)$")


def q_domain_pagerank(sf_dir: str):
    """Domain-level PageRank by GRAPH COARSENING: aggregate the page
    multigraph to weighted domain edges (one distributed groupby — the
    only corpus-sized step), then run the exact integer fixed-point on
    the coarsened graph, which is bounded by the DOMAIN alphabet (~10^7
    on the real web vs 10^12 pages — the coarsen-then-solve pattern that
    makes host-level rank computable at all). Same integer 1e-9-unit
    arithmetic as q_pagerank (PR_SCALE / 85:100 damping, floor division
    per edge), weighted by edge multiplicity; the oracle unrolls the
    identical recurrence in SQL, so the fixed point is bit-equal."""
    edges = _outlinks_ds(link_corpus())

    def to_domains(t: pa.Table) -> pa.Table:
        sd = pc.extract_regex(t["src"], pattern=r"https://(?P<dom>[^/]+)/")
        dd_ = pc.extract_regex(t["dst"], pattern=r"https://(?P<dom>[^/]+)/")
        return pa.table(
            {
                "sdom": pc.struct_field(sd, "dom"),
                "ddom": pc.struct_field(dd_, "dom"),
            }
        )

    w = (
        edges.map_batches(to_domains, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby(["sdom", "ddom"])
        .aggregate(ray.data.aggregate.Count(alias_name="w"))
        .take_all()
    )  # O(domains^2) upper bound, O(observed domain pairs) actual
    doms = sorted({r["sdom"] for r in w} | {r["ddom"] for r in w})
    ndom = len(doms)
    tw: dict[str, int] = {}
    for r in w:
        tw[r["sdom"]] = tw.get(r["sdom"], 0) + r["w"]
    rank = {d: PR_SCALE // ndom for d in doms}
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ndom)
    for _ in range(PR_ITERS):
        contrib = {d: 0 for d in doms}
        for r in w:
            contrib[r["ddom"]] += rank[r["sdom"]] * r["w"] // tw[r["sdom"]]
        rank = {
            d: base + PR_DAMP_NUM * contrib[d] // PR_DAMP_DEN for d in doms
        }
    return pa.table(
        {
            "domain": pa.array(doms, pa.string()),
            "rank_e9": pa.array([rank[d] for d in doms], pa.int64()),
        }
    )


def domain_pagerank_oracle_sql(pages_dir: str) -> str:
    prev = "r0"
    rounds = []
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""
r{i} as (
  select d.d,
         {PR_SCALE}::hugeint * ({PR_DAMP_DEN} - {PR_DAMP_NUM})
           // ({PR_DAMP_DEN} * (select n from n))
         + {PR_DAMP_NUM} * coalesce((
             select sum({prev}.r * w.w // ws.tw)
             from w join {prev} on {prev}.d = w.sdom
                    join ws on ws.sdom = w.sdom
             where w.ddom = d.d), 0) // {PR_DAMP_DEN} as r
  from doms d)""")
        prev = f"r{i}"
    rounds_sql = ",".join(rounds)
    return f"""
with e as (
  select regexp_extract(src, 'https://([^/]+)/', 1) as sdom,
         regexp_extract(dst, 'https://([^/]+)/', 1) as ddom
  from ({outlinks_oracle_sql(pages_dir)})),
w as (select sdom, ddom, count(*)::hugeint as w from e group by 1, 2),
ws as (select sdom, sum(w)::hugeint as tw from w group by 1),
doms as (select distinct sdom as d from w
         union select distinct ddom from w),
n as (select count(*)::hugeint as n from doms),
r0 as (select d, {PR_SCALE}::hugeint // (select n from n) as r from doms),
{rounds_sql}
select d as domain, r::bigint as rank_e9 from {prev}
"""


NEG_CAND_T = 8  # deterministic candidate probes per node
NEG_PER_NODE = 3  # negatives kept per node


def q_graph_negative_edges(sf_dir: str):
    """Negative-edge sampling for link-prediction training (the GNN /
    graph-embedding data-prep step): for every page node, probe
    NEG_CAND_T arithmetic candidates j = (i*131 + t*257 + 13) mod n
    (reproducible across runs/engines — no RNG state), drop self-loops
    and TRUE edges (zero false negatives, the property that matters),
    keep the first NEG_PER_NODE survivors in probe order. The
    true-edge check is one bounded groupby((a, b)) against the distinct
    edge set — candidate volume is O(nodes x T), never node-squared;
    per-node finishing groups are bounded by T."""
    pages_dir = link_corpus()
    n = LINK_N

    def candidates(t: pa.Table) -> pa.Table:
        out_i, out_t, out_j = [], [], []
        for u in t["url"].to_pylist():
            i = int(_PAGE_ID_RE.search(u).group(1))
            for tt in range(NEG_CAND_T):
                j = (i * 131 + tt * 257 + 13) % n
                if j != i:
                    out_i.append(i)
                    out_t.append(tt)
                    out_j.append(j)
        return pa.table(
            {
                "a": pa.array(out_i, pa.int64()),
                "t": pa.array(out_t, pa.int64()),
                "b": pa.array(out_j, pa.int64()),
                "kind": pa.array(["cand"] * len(out_i), pa.string()),
            }
        )

    cand = rd.read_parquet(pages_dir, columns=["url"]).map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    )

    def edge_ids(t: pa.Table) -> pa.Table:
        a = [int(_PAGE_ID_RE.search(u).group(1))
             for u in t["src"].to_pylist()]
        b = [int(_PAGE_ID_RE.search(u).group(1))
             for u in t["dst"].to_pylist()]
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "t": pa.array([-1] * len(a), pa.int64()),
                "b": pa.array(b, pa.int64()),
                "kind": pa.array(["edge"] * len(a), pa.string()),
            }
        )

    edges = _outlinks_ds(pages_dir).map_batches(
        edge_ids, batch_format="pyarrow", zero_copy_batch=True
    )

    def anti(g: pa.Table) -> pa.Table:
        # one (a, b) pair's rows: candidates survive iff no edge row
        if "edge" in g["kind"].to_pylist():
            return pa.table(
                {"a": pa.array([], pa.int64()),
                 "t": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64())}
            )
        g = g.take(pc.sort_indices(g["t"]))
        return g.select(["a", "t", "b"]).slice(0, 1)  # distinct candidate

    survivors = cand.union(edges).groupby(["a", "b"]).map_groups(
        anti, batch_format="pyarrow"
    )

    def per_node(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g["t"]))
        g = g.slice(0, NEG_PER_NODE)
        return pa.table(
            {
                "src_id": g["a"],
                "neg_id": g["b"],
                "t": g["t"],
            }
        )

    return survivors.groupby("a").map_groups(
        per_node, batch_format="pyarrow"
    )


def graph_negative_edges_oracle_sql(pages_dir: str) -> str:
    return f"""
with pages as (
  select cast(regexp_extract(url, 'p(\\d+)$', 1) as bigint) as i
  from read_parquet('{pages_dir}/*.parquet')),
edges as (
  select distinct
         cast(regexp_extract(src, 'p(\\d+)$', 1) as bigint) as a,
         cast(regexp_extract(dst, 'p(\\d+)$', 1) as bigint) as b
  from ({outlinks_oracle_sql(pages_dir)})),
cand as (
  select i, t, (i * 131 + t * 257 + 13) % {LINK_N} as j
  from pages cross join (select unnest(range({NEG_CAND_T})) as t)),
filt as (
  select i, j, min(t) as t from cand
  where j <> i and not exists
    (select 1 from edges e where e.a = cand.i and e.b = cand.j)
  group by i, j),
ranked as (
  select *, row_number() over (partition by i order by t) as rn
  from filt)
select i as src_id, j as neg_id, t::bigint as t
from ranked where rn <= {NEG_PER_NODE}
"""


def q_score_calibrate(sf_dir: str):
    """Per-source score calibration by percentile rank: each doc's
    n_chars mapped to its WITHIN-SOURCE percentile (integer ppm of
    row_number-1 over n_source-1) — the normalization a curation
    pipeline applies before one global quality threshold so that a
    verbose source and a terse one are cut at the same RELATIVE depth.
    Same no-global-sort rank decomposition as q_global_rank, partitioned
    by source: per-(source, value, id-bucket) counts -> driver cumsum
    within source (O(distinct keys), not rows; the tree-prefix-sum
    upgrade applies past driver scale) -> per-group enumeration +
    integer ppm. Single-row sources calibrate to 0, like SQL."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return t.append_column("bucket", pc.cast(b, pa.int64()))

    with_bucket = docs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        with_bucket.groupby(["source", "n_chars", "bucket"])
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )
    base: dict[tuple[str, int, int], int] = {}
    totals: dict[str, int] = {}
    for r in sorted(
        counts, key=lambda r: (r["source"], r["n_chars"], r["bucket"])
    ):
        key = (r["source"], r["n_chars"], r["bucket"])
        base[key] = totals.get(r["source"], 0)
        totals[r["source"]] = base[key] + r["n"]
    bref = ray.put((base, totals))

    def calibrate(g: pa.Table) -> pa.Table:
        offsets, tot = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        src = g["source"][0].as_py()
        start = offsets[(src, g["n_chars"][0].as_py(),
                         g["bucket"][0].as_py())]
        n_src = tot[src]
        ppm = [
            (start + i) * 1_000_000 // (n_src - 1) if n_src > 1 else 0
            for i in range(len(g))
        ]
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "source": g["source"],
                "calibrated_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return with_bucket.groupby(["source", "n_chars", "bucket"]).map_groups(
        calibrate, batch_format="pyarrow"
    )


SCORE_CALIBRATE_SQL = """
select doc_id, source,
       case when count(*) over (partition by source) > 1
            then (row_number() over
                    (partition by source order by n_chars, doc_id) - 1)
                 * 1000000
                 // (count(*) over (partition by source) - 1)
            else 0 end::bigint as calibrated_ppm
from documents
"""



WAU_WINDOW = 7  # trailing days in the rolling active-user window


def q_wau_rolling(sf_dir: str):
    """Rolling 7-day active users (WAU) per calendar day — the
    engagement metric every event pipeline reports next to DAU. Exact
    and shuffle-bounded: dedupe to DISTINCT (user, day) per batch
    before the first shuffle, fan each active-day out to the <= W
    window days it contributes to, dedupe (window_day, user) with one
    groupby (shuffle is O(active-user-days x W) counters, never raw
    events), and count per day. Days with no events in range simply
    don't appear (same semantics as the oracle's join)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        di = pc.divide(
            pc.cast(day, pa.int64()), pa.scalar(86_400_000_000, pa.int64())
        )
        return (
            pa.table({"user_id": t["user_id"], "day_i": di})
            .group_by(["user_id", "day_i"])
            .aggregate([])
        )

    ud = (
        ds.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["user_id", "day_i"])
        .count()  # distinct via Count aggregate (round-3 ADVICE shape)
        .select_columns(["user_id", "day_i"])
    )
    day_rows = ud.groupby("day_i").count().take_all()
    days_present = {r["day_i"] for r in day_rows}  # O(calendar days)
    dref = ray.put(days_present)

    def fan_out(t: pa.Table) -> pa.Table:
        present = ray.get(dref)
        us, ws = [], []
        for u, d in zip(t["user_id"].to_pylist(), t["day_i"].to_pylist()):
            for k in range(WAU_WINDOW):
                if d + k in present:
                    us.append(u)
                    ws.append(d + k)
        return (
            pa.table(
                {
                    "user_id": pa.array(us, pa.int64()),
                    "wd": pa.array(ws, pa.int64()),
                }
            )
            .group_by(["user_id", "wd"])
            .aggregate([])
        )

    win = (
        ud.map_batches(fan_out, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["user_id", "wd"])
        .count()
        .select_columns(["user_id", "wd"])
    )

    def finish(t: pa.Table) -> pa.Table:
        import datetime as _dtt

        days = [
            (_dtt.date(1970, 1, 1) + _dtt.timedelta(days=int(d))).isoformat()
            for d in t["wd"].to_pylist()
        ]
        return pa.table(
            {
                "day": pa.array(days, pa.string()),
                "wau": pc.cast(t["count()"], pa.int64()),
            }
        )

    return (
        win.groupby("wd")
        .count()
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


WAU_ROLLING_SQL = f"""
with ud as (select distinct user_id, ts::date as day from events),
days as (select distinct day from ud),
win as (
  select distinct d.day, u.user_id
  from days d join ud u on u.day between d.day - {WAU_WINDOW - 1} and d.day)
select strftime(day, '%Y-%m-%d') as day, count(*)::bigint as wau
from win group by 1
"""


def q_hll_cumulative(sf_dir: str):
    """Cumulative distinct users per day from a mergeable HLL sketch —
    the growth-curve op ("how many unique users ever, as of each day")
    that exact counting cannot stream: per-batch partials emit <= 64
    (day, register, rank) rows, one bounded groupby maxes registers per
    day, and the driver prefix-maxes the O(calendar-days x 64) register
    table (days are calendar-bounded at any corpus scale) before
    running the standard estimator per day. The register prefix-max IS
    the HLL union law, so day d's estimate equals a sketch built from
    scratch over all events <= d. Same deterministic md5 hashing and
    exact-integer estimator as approx_distinct_hll, replayed per-day by
    the oracle."""
    from ..stages import sketch as sk

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        di = pc.divide(
            pc.cast(day, pa.int64()), pa.scalar(86_400_000_000, pa.int64())
        )
        out_d, out_j, out_r = [], [], []
        per_day: dict[int, dict[int, int]] = {}
        for u, d in zip(t["user_id"].to_pylist(), di.to_pylist()):
            if u is None:
                continue
            hv = sk._h60(u)  # the sketch module's md5-hex convention
            j = hv >> sk._HLL_SUFFIX_BITS
            rank = sk.hll_rank(hv & ((1 << sk._HLL_SUFFIX_BITS) - 1))
            regs = per_day.setdefault(d, {})
            if rank > regs.get(j, 0):
                regs[j] = rank
        for d, regs in per_day.items():
            for j, r in regs.items():
                out_d.append(d)
                out_j.append(j)
                out_r.append(r)
        return pa.table(
            {
                "day_i": pa.array(out_d, pa.int64()),
                "j": pa.array(out_j, pa.int64()),
                "rank": pa.array(out_r, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["day_i", "j"])
        .max("rank")
        .take_all()
    )  # O(days x 64)
    days = sorted({r["day_i"] for r in rows})
    by_day: dict[int, dict[int, int]] = {d: {} for d in days}
    for r in rows:
        by_day[r["day_i"]][r["j"]] = r["max(rank)"]
    import datetime as _dtt

    regs = [0] * sk.HLL_M
    out_day, out_est = [], []
    for d in days:
        for j, rk in by_day[d].items():
            if rk > regs[j]:
                regs[j] = rk
        est_t = sk.hll_estimate_batch(
            pa.table(
                {
                    "j": pa.array(range(sk.HLL_M), pa.int64()),
                    "rank": pa.array(regs, pa.int64()),
                }
            )
        )
        out_day.append(
            (_dtt.date(1970, 1, 1) + _dtt.timedelta(days=int(d))).isoformat()
        )
        out_est.append(est_t["est_distinct"][0].as_py())
    return pa.table(
        {
            "day": pa.array(out_day, pa.string()),
            "est_users": pa.array(out_est, pa.float64()),
        }
    )


def hll_cumulative_oracle_sql() -> str:
    from ..stages import sketch as sk

    suffix = sk._HLL_SUFFIX_BITS
    cases = [f"when w = 0 then {suffix + 1}"]
    for k in range(suffix - 1, -1, -1):
        cases.append(f"when w >= {1 << k} then {suffix - k}")
    rank_case = "case " + " ".join(cases) + " end"
    num = repr(sk.HLL_NUM)
    return f"""
with ev as (
  select distinct user_id, ts::date as day from events
  where user_id is not null),
days as (select distinct day from ev),
h as (
  select day,
    ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::ubigint::bigint
      as hv
  from ev),
rw as (select day, hv >> {suffix} as j,
              hv & {(1 << suffix) - 1} as w from h),
mr as (
  select d.day, rw.j, max({rank_case}) as m_j
  from days d join rw on rw.day <= d.day
  group by d.day, rw.j),
regs as (
  select d.day, t.j, coalesce(mr.m_j, 0) as m_j
  from days d
  cross join (select unnest(generate_series(0, {sk.HLL_M - 1})) as j) t
  left join mr on mr.day = d.day and mr.j = t.j),
s as (select day,
             sum(1::bigint << ({suffix + 1} - m_j))::bigint as s_scaled,
             sum(case when m_j = 0 then 1 else 0 end)::bigint as v_zero
      from regs group by day)
select strftime(day, '%Y-%m-%d') as day,
       round(case when {num} / s_scaled <= {2.5 * sk.HLL_M}
                   and v_zero > 0
                  then {sk.HLL_M} * ln({sk.HLL_M}.0 / v_zero)
                  else {num} / s_scaled end, 6) as est_users
from s
"""



SPAN_DIV = 16  # anchor sampling rate: keep window-hashes ≡ 0 mod 16


def q_match_spans(sf_dir: str):
    """Copy-span LOCALIZATION (the attribution step after dedup flags a
    pair): sample content-defined anchor positions — byte positions
    whose 16-byte rolling window hash is ≡ 0 mod SPAN_DIV, the same
    ``_rolling_accs`` recurrence CDC chunking uses, so anchors move
    WITH the content under edits — and join anchors across docs on the
    window hash. Every emitted (a, b, a_pos, b_pos) row is a 16-byte
    verbatim match between the two docs at those positions; runs of
    consecutive rows trace out the shared span. Dataflow: stateless
    anchor scan -> one groupby(anchor) with per-group pairing (hot
    anchors = corpus-wide boilerplate windows; the group is capped by
    the same star-collapse argument as the LSH buckets — here the
    word-soup fixture peaks at ~30 docs/anchor so the exact pairing is
    itself the oracle semantics). The oracle replays the identical
    HUGEINT recurrence (shared CTE head with cdc_dedup) and the same
    equi-join."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def anchors(t: pa.Table) -> pa.Table:
        ids_out, t_out, a_out = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            data = (txt or "").encode("utf-8")
            n = len(data)
            if n == 0:
                continue
            w = min(tx.CDC_WINDOW, n)
            h = tx._rolling_accs(
                np.frombuffer(data, dtype=np.uint8).astype(np.uint64), w
            )
            for tt in range(w, n + 1):
                acc = int(h[tt - w])
                if acc % SPAN_DIV == 0:
                    ids_out.append(did)
                    t_out.append(tt)
                    a_out.append(acc)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "pos": pa.array(t_out, pa.int64()),
                "anchor": pa.array(a_out, pa.int64()),
            }
        )

    anc = docs.map_batches(
        anchors, batch_format="pyarrow", zero_copy_batch=True
    )

    def pair_anchor(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("doc_id", "ascending"), ("pos", "ascending")]
        )
        g = g.take(order)
        ids = g["doc_id"].to_pylist()
        poss = g["pos"].to_pylist()
        acc = g["anchor"][0].as_py()
        a, b, ap, bp = [], [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue  # same-doc repeat, not a cross-doc match
                a.append(ids[i])
                b.append(ids[j])
                ap.append(poss[i])
                bp.append(poss[j])
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "a_pos": pa.array(ap, pa.int64()),
                "b_pos": pa.array(bp, pa.int64()),
                "anchor": pa.array([acc] * len(a), pa.int64()),
            }
        )

    return anc.groupby("anchor").map_groups(
        pair_anchor, batch_format="pyarrow"
    )


def match_spans_oracle_sql() -> str:
    base = _rolling_oracle_sql()
    head = base[: base.index("fp as (")]
    return head + f"""
anchors as (
  select r.doc_id, r.t as pos, r.acc
  from r join s2 using (doc_id)
  where r.t >= s2.w and r.acc % {SPAN_DIV} = 0)
select xa.doc_id as a, xb.doc_id as b,
       xa.pos as a_pos, xb.pos as b_pos,
       xa.acc::bigint as anchor
from anchors xa
join anchors xb on xa.acc = xb.acc and xa.doc_id < xb.doc_id
"""


MERGE_INS_N = 50  # synthetic inserts in the deterministic delta


def q_merge_upserts(sf_dir: str):
    """Lakehouse MERGE (upsert + tombstone-delete + insert) as one
    bounded-group dataflow — the snapshot-maintenance op between full
    recrawls: base rows and delta rows union TAGGED, ONE groupby(key)
    with <= 2 rows per group resolves precedence (delete beats update
    beats base; inserts have no base row), exactly the snapshot_diff
    decomposition. The delta here is derived deterministically from the
    base (update doc_id%10, delete doc_id%17 — delete wins the overlap
    — insert MERGE_INS_N fresh keys), so both engines state the same
    MERGE without a fixture. Output carries row_version (0 base kept /
    1 delta applied) — the audit column an incremental pipeline
    checkpoints."""
    base = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def tag_base(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "op": pa.array(["base"] * len(t), pa.string()),
            }
        )

    def make_delta(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        chars = t["n_chars"].to_pylist()
        out_id, out_lang, out_n, out_op = [], [], [], []
        for i, c in zip(ids, chars):
            if i % 17 == 0:
                out_id.append(i)
                out_lang.append("")
                out_n.append(0)
                out_op.append("del")
            elif i % 10 == 0:
                out_id.append(i)
                out_lang.append("xx")
                out_n.append(c + 1000)
                out_op.append("upd")
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
                "n_chars": pa.array(out_n, pa.int64()),
                "op": pa.array(out_op, pa.string()),
            }
        )

    inserts = pa.table(
        {
            "doc_id": pa.array(
                [1_000_000_000 + k for k in range(MERGE_INS_N)], pa.int64()
            ),
            "lang": pa.array(["new"] * MERGE_INS_N, pa.string()),
            "n_chars": pa.array(
                [100 + k for k in range(MERGE_INS_N)], pa.int64()
            ),
            "op": pa.array(["ins"] * MERGE_INS_N, pa.string()),
        }
    )

    tagged = (
        base.map_batches(tag_base, batch_format="pyarrow",
                         zero_copy_batch=True)
        .union(base.map_batches(make_delta, batch_format="pyarrow",
                                zero_copy_batch=True))
        .union(rd.from_arrow(inserts))
    )

    def resolve(g: pa.Table) -> pa.Table:
        ops = g["op"].to_pylist()
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
                "row_version": pa.array([], pa.int64()),
            }
        )
        if "del" in ops:
            return empty
        for kind, ver in (("upd", 1), ("ins", 1), ("base", 0)):
            if kind in ops:
                row = g.slice(ops.index(kind), 1)
                return pa.table(
                    {
                        "doc_id": row["doc_id"],
                        "lang": row["lang"],
                        "n_chars": row["n_chars"],
                        "row_version": pa.array([ver], pa.int64()),
                    }
                )
        return empty

    return tagged.groupby("doc_id").map_groups(
        resolve, batch_format="pyarrow"
    )


MERGE_UPSERTS_SQL = f"""
with base as (select doc_id, lang, n_chars from documents),
merged as (
  select doc_id, lang, n_chars, 0 as row_version
  from base where doc_id % 17 <> 0 and doc_id % 10 <> 0
  union all
  select doc_id, 'xx', n_chars + 1000, 1
  from base where doc_id % 17 <> 0 and doc_id % 10 = 0
  union all
  select 1000000000 + k, 'new', 100 + k, 1
  from (select unnest(range({MERGE_INS_N})) as k))
select doc_id, lang, n_chars::bigint as n_chars,
       row_version::bigint as row_version
from merged
"""



SPAN_GAP = 64  # max byte gap between anchors inside one merged span


def q_span_intervals(sf_dir: str):
    """Merged copy-span INTERVALS — the gaps-and-islands pass over
    q_match_spans' anchor matches: within a doc pair, consecutive
    anchors whose positions advance by the SAME delta on both sides
    (and by <= SPAN_GAP bytes) belong to one contiguous shared span;
    each island reports its byte interval in both docs plus its anchor
    count — the per-pair evidence a takedown/attribution workflow
    consumes. One groupby(pair) with groups bounded by doc length; the
    island rule is replayed in SQL with lag() + a windowed running sum
    (the canonical gaps-and-islands formulation)."""
    w = tx.CDC_WINDOW
    spans = q_match_spans(sf_dir)

    # one (a, b) pair = one island computation, but a per-pair
    # map_groups is a Python call per group (32 s on the 100k+ pairs of
    # the sf0.1 corpus). Salt-partition on hash(a, b) instead: each
    # partition sorts once and runs the island rule VECTORIZED over all
    # its pairs at once (group changes are just another break flag) —
    # 32 s -> ~4 s, value-identical.
    n_parts = 64

    def salt(t: pa.Table) -> pa.Table:
        p = pc.bit_wise_and(
            pc.add(pc.multiply(pc.cast(t["a"], pa.int64()), 2654435761),
                   t["b"]),
            n_parts - 1,
        )
        return t.append_column("p", pc.cast(p, pa.int64()))

    def islands_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("a", "b", "a_start", "a_end", "b_start",
                           "b_end", "n_anchors")}
            )
        order = pc.sort_indices(
            g, sort_keys=[("a", "ascending"), ("b", "ascending"),
                          ("a_pos", "ascending"), ("b_pos", "ascending")]
        )
        g = g.take(order)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        ap = g["a_pos"].to_numpy(zero_copy_only=False)
        bp = g["b_pos"].to_numpy(zero_copy_only=False)
        brk = np.ones(len(a), dtype=bool)  # row 0 starts an island
        if len(a) > 1:
            da = ap[1:] - ap[:-1]
            db = bp[1:] - bp[:-1]
            same_pair = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
            brk[1:] = ~same_pair | (da > SPAN_GAP) | (da != db)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(a)) - 1
        return pa.table(
            {
                "a": pa.array(a[starts], pa.int64()),
                "b": pa.array(b[starts], pa.int64()),
                "a_start": pa.array(ap[starts] - w + 1, pa.int64()),
                "a_end": pa.array(ap[ends], pa.int64()),
                "b_start": pa.array(bp[starts] - w + 1, pa.int64()),
                "b_end": pa.array(bp[ends], pa.int64()),
                "n_anchors": pa.array(ends - starts + 1, pa.int64()),
            }
        )

    return (
        spans.map_batches(salt, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("p")
        .map_groups(islands_part, batch_format="pyarrow")
    )


def span_intervals_oracle_sql() -> str:
    w = tx.CDC_WINDOW
    return f"""
with m as ({match_spans_oracle_sql()}),
o as (
  select a, b, a_pos, b_pos,
         case when a_pos - lag(a_pos) over win > {SPAN_GAP}
               or (a_pos - lag(a_pos) over win)
                  <> (b_pos - lag(b_pos) over win)
              then 1 else 0 end as brk
  from m
  window win as (partition by a, b order by a_pos, b_pos)),
i as (
  select *, sum(brk) over (partition by a, b order by a_pos, b_pos
                           rows unbounded preceding) as isl
  from o)
select a, b,
       (min(a_pos) - {w} + 1)::bigint as a_start,
       max(a_pos)::bigint as a_end,
       (min(b_pos) - {w} + 1)::bigint as b_start,
       max(b_pos)::bigint as b_end,
       count(*)::bigint as n_anchors
from i group by a, b, isl
"""


def q_partitioned_write_roundtrip(sf_dir: str):
    """Partitioned parquet SINK roundtrip — the resumable-output
    contract as a value-verified op: write documents hive-partitioned
    by lang (one directory per partition, the layout a failed 100 TB
    run resumes by skipping finished partitions), read the directory
    tree back with partition-column discovery, and aggregate per lang
    FROM THE ROUNDTRIPPED DATA. The oracle aggregates the original
    table directly, so a green hash proves the write->read cycle is
    lossless including the partition column itself."""
    import shutil
    import tempfile

    out_root = os.path.join(
        tempfile.gettempdir(), "aper_partwrite",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    if os.path.isdir(out_root):
        shutil.rmtree(out_root)
    _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).write_parquet(
        out_root, partition_cols=["lang"]
    )
    back = rd.read_parquet(out_root)

    def partial(t: pa.Table) -> pa.Table:
        part = t.group_by("lang").aggregate(
            [("doc_id", "count"), ("n_chars", "sum")]
        )
        return part.rename_columns(["lang", "n_docs", "total_chars"])

    return (
        back.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("total_chars", alias_name="total_chars"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "n_docs": pc.cast(t["n_docs"], pa.int64()),
                    "total_chars": pc.cast(t["total_chars"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


PARTITIONED_WRITE_SQL = """
select lang, count(*)::bigint as n_docs,
       sum(n_chars)::bigint as total_chars
from documents group by lang
"""



DUPRATE_SAMPLE_K = 60  # fixed-size md5-order sample (bounded at any scale)


def q_dup_rate_estimate(sf_dir: str):
    """Corpus duplicate-RATE estimation from a fixed-size uniform
    sample — the pre-dedup planning scalar ("how much will near-dedup
    remove?") that sizes the real dedup job before paying for it. The
    sample is the K smallest docs by md5(doc_id) (KMV-style: a
    deterministic uniform sample whose size is CONSTANT at any corpus
    scale, selected distributedly by the per-block top-K reduce), then
    all C(K,2) pairs verify exact word-3-gram Jaccard in one task —
    bounded work by construction. Output is one row: sample size, pair
    count, pairs at >= 0.5, and the ppm rate whose sampling error is
    the standard binomial bound. Shingles, rounding, and threshold are
    byte-identical to the dedup chain's verify (same ``_shingles`` /
    SQL ``list_intersect`` round-6 formula)."""
    from ..stages.topk import dataset_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_md5(t: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(str(i).encode()).hexdigest()
            for i in t["doc_id"].to_pylist()
        ]
        return t.append_column("mk", pa.array(keys, pa.string()))

    smp = dataset_topk(
        docs.map_batches(add_md5, batch_format="pyarrow",
                         zero_copy_batch=True),
        sort_keys=[("mk", "ascending"), ("doc_id", "ascending")],
        k=DUPRATE_SAMPLE_K,
    ).take_all()  # K rows — constant
    ids = [r["doc_id"] for r in smp]
    txts = {r["doc_id"]: r["text"] for r in smp}
    ids.sort()
    a, b, ta, tb = [], [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
            ta.append(txts[ids[i]])
            tb.append(txts[ids[j]])
    pairs = pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "text_a": pa.array(ta, pa.string()),
            "text_b": pa.array(tb, pa.string()),
        }
    )
    verified = dd.jaccard_pairs_batch(pairs)
    n_pairs = len(verified)
    n_dup = int(
        pc.sum(
            pc.cast(pc.greater_equal(verified["jaccard"], 0.5), pa.int64())
        ).as_py()
        or 0
    )
    return pa.table(
        {
            "n_sample": pa.array([len(ids)], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_dup": pa.array([n_dup], pa.int64()),
            "dup_rate_ppm": pa.array(
                [n_dup * 1_000_000 // n_pairs if n_pairs else 0], pa.int64()
            ),
        }
    )


def dup_rate_oracle_sql() -> str:
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with smp as (
  select doc_id, text from documents
  order by md5(cast(doc_id as varchar)), doc_id
  limit {DUPRATE_SAMPLE_K}),
toks as (select doc_id, {tokenize} as toks from smp),
sh as (
  select doc_id,
         list_distinct(
           case when len(toks) >= 3 then
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' '
                                 || toks[i+2])
           when len(toks) >= 1 then [array_to_string(toks, ' ')]
           else [] end) as sd
  from toks),
p as (
  select x.doc_id as a, y.doc_id as b,
         round(len(list_intersect(x.sd, y.sd))::double /
               nullif(len(x.sd) + len(y.sd)
                      - len(list_intersect(x.sd, y.sd)), 0), 6) as j
  from sh x join sh y on x.doc_id < y.doc_id)
select count(*)::bigint as n_pairs,
       (select count(*) from smp)::bigint as n_sample,
       sum(case when j >= 0.5 then 1 else 0 end)::bigint as n_dup,
       (sum(case when j >= 0.5 then 1 else 0 end) * 1000000
        // count(*))::bigint as dup_rate_ppm
from p
"""


CH_CRAWLERS = 8  # crawler shards on the consistent-hash ring
CH_VNODES = 32  # virtual nodes per crawler (load smoothing)


def q_consistent_hash_assign(sf_dir: str):
    """Consistent-hash domain->crawler assignment — the frontier
    sharding every polite distributed crawler needs: each crawler owns
    CH_VNODES points on a hash ring; a domain goes to the crawler
    owning the first ring point clockwise of md5(domain). Adding or
    removing one crawler remaps only ~1/K of domains (the property
    plain mod-K sharding lacks — that is the op's reason to exist).
    The ring is 256 points built once and closed over (constant size);
    assignment is a stateless vectorized bisect per batch over the
    per-domain rollup. Output carries n_docs so the load balance the
    vnodes buy is itself visible (and asserted in pytest)."""
    import bisect

    ring: list[tuple[int, int]] = []
    for c in range(CH_CRAWLERS):
        for v in range(CH_VNODES):
            h = int(hashlib.md5(f"c{c}v{v}".encode()).hexdigest()[:16], 16)
            ring.append((h, c))
    ring.sort()
    ring_h = [h for h, _ in ring]

    doms = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(ray.data.aggregate.Count(alias_name="n_docs"))
    )

    def assign(t: pa.Table) -> pa.Table:
        crawlers = []
        for d in t["source"].to_pylist():
            dh = int(hashlib.md5(d.encode()).hexdigest()[:16], 16)
            i = bisect.bisect_left(ring_h, dh)
            crawlers.append(ring[i][1] if i < len(ring) else ring[0][1])
        return pa.table(
            {
                "domain": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "crawler": pa.array(crawlers, pa.int64()),
            }
        )

    return doms.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


CONSISTENT_HASH_SQL = f"""
with ring as (
  select c, v,
         ('0x' || substr(md5('c' || c || 'v' || v), 1, 16))::ubigint as h
  from (select unnest(range({CH_CRAWLERS})) as c)
  cross join (select unnest(range({CH_VNODES})) as v)),
doms as (
  select source as domain, count(*)::bigint as n_docs
  from documents group by 1),
dh as (
  select domain, n_docs,
         ('0x' || substr(md5(domain), 1, 16))::ubigint as h
  from doms)
select d.domain, d.n_docs,
       (select r.c from ring r
        where r.h = coalesce((select min(r2.h) from ring r2
                              where r2.h >= d.h),
                             (select min(r3.h) from ring r3))
        )::bigint as crawler
from dh d
"""



def q_cluster_chaining_audit(sf_dir: str):
    """Transitivity audit of the near-dup clusters — the methodological
    check on single-linkage chaining: a component's member pairs split
    into DIRECT (an actual verified Jaccard>=0.5 edge) and CHAINED
    (merged only through intermediates, the A~B~C but A!~C artifact
    that makes over-aggressive cluster-level dedup delete
    non-duplicates). Reuses the cluster chain's own verified edge list
    and component labels; per-cluster sizes and edge counts union-tag
    into ONE groupby(rep) with <= 2 rows per group, chained = C(sz,2)
    - direct is plain arithmetic. High chained share = lower the LSH
    threshold or switch keep-best to per-edge."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _lsh_distinct_pairs(sf_dir)
    verified = dd.attach_pair_texts(pairs, docs).map_batches(
        dd.jaccard_pairs_batch, batch_format="pyarrow"
    ).filter(expr="jaccard >= 0.5").select_columns(["a", "b"])
    verified = verified.materialize()  # reused by both branches below
    cc = dd.connected_components(verified).materialize()

    sizes = cc.groupby("rep_id").aggregate(
        ray.data.aggregate.Count(alias_name="sz")
    )

    rep_of = cc.map_batches(
        lambda t: pa.table(
            {"a": t["doc_id"], "rep_id": t["rep_id"]}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # round-4 driver flake: the fixed-partition hash join here died on a
    # degenerate zero-column empty block (the sort/groupby empty-input
    # schema-loss class). safe_join broadcasts the tiny rep map — no
    # shuffle, hazard structurally impossible (stages/joins.py).
    edge_reps = (
        sj.safe_join(
            verified, rep_of, on=("a",), join_type="inner",
            left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
            right_schema=pa.schema(
                [("a", pa.int64()), ("rep_id", pa.int64())]
            ),
        )
        .groupby("rep_id")
        .aggregate(ray.data.aggregate.Count(alias_name="n_direct"))
    )

    def tag_sizes(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "rep_id": pc.cast(t["rep_id"], pa.int64()),
                "sz": pc.cast(t["sz"], pa.int64()),
                "n_direct": z,
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "rep_id": pc.cast(t["rep_id"], pa.int64()),
                "sz": z,
                "n_direct": pc.cast(t["n_direct"], pa.int64()),
            }
        )

    both = sizes.map_batches(
        tag_sizes, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        edge_reps.map_batches(
            tag_edges, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        sz = pc.cast(t["sz"], pa.int64())
        nd = pc.cast(t["n_direct"], pa.int64())
        pairs_tot = pc.divide(
            pc.multiply(sz, pc.subtract(sz, pa.scalar(1, pa.int64()))),
            pa.scalar(2, pa.int64()),
        )
        return pa.table(
            {
                "rep_id": pc.cast(t["rep_id"], pa.int64()),
                "size": sz,
                "n_direct": nd,
                "n_chained": pc.subtract(pairs_tot, nd),
            }
        )

    return (
        both.groupby("rep_id")
        .aggregate(
            ray.data.aggregate.Sum("sz", alias_name="sz"),
            ray.data.aggregate.Sum("n_direct", alias_name="n_direct"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


CLUSTER_CHAINING_SQL_SUFFIX = """
, sd as (select doc_id, list_distinct(shingles) as sd from sh),
verified as (
  select p.a, p.b
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= 0.5),
edges as (select a as src, b as dst from verified
          union select b, a from verified),
comp as (
  select node, rep_id from (
    with recursive cc3(node, reached) as (
      select src, src from edges
      union
      select cc3.node, e.dst from cc3 join edges e on e.src = cc3.reached
    )
    select node, min(reached) as rep_id from cc3 group by node
  )),
sizes as (select rep_id, count(*)::bigint as sz from comp group by 1),
de as (
  select c.rep_id, count(*)::bigint as nd
  from verified v join comp c on c.node = v.a
  group by 1)
select s.rep_id, s.sz as size,
       coalesce(de.nd, 0)::bigint as n_direct,
       (s.sz * (s.sz - 1) // 2 - coalesce(de.nd, 0))::bigint as n_chained
from sizes s left join de using (rep_id)
"""


RELIABILITY_BIN_WIDTH = 10_000
RELIABILITY_OFFSET = 1_000_000  # keeps the binned value positive, so
# Python floor-div == DuckDB truncating-div


def q_score_reliability(sf_dir: str):
    """Reliability (calibration) curve for the model-based quality
    filter: fixed-width bins of the integer logit vs the observed
    positive rate of a proxy label (lang == 'en' — the signal the
    fixture's logit weights were built against). The eval every learned
    filter needs before its threshold is trusted: monotone pos_ppm
    across bins = well-ordered scores. Composition of two existing
    per-doc passes (logit scores, language column) union-tagged into
    one bounded groupby(doc_id) merge — the snapshot_diff shape — then
    a stateless bin map and an O(bins) rollup."""
    lg = q_quality_logit(sf_dir)
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def tag_logit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "logit_ppm": pc.cast(t["logit_ppm"], pa.int64()),
                "is_en": pa.nulls(len(t), pa.int64()).fill_null(-1),
            }
        )

    def tag_lang(t: pa.Table) -> pa.Table:
        en = pc.cast(
            pc.equal(t["lang"], pa.scalar("en")), pa.int64()
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "logit_ppm": pa.nulls(len(t), pa.int64()).fill_null(
                    -(10**15)
                ),
                "is_en": en,
            }
        )

    merged = (
        lg.map_batches(tag_logit, batch_format="pyarrow",
                       zero_copy_batch=True)
        .union(langs.map_batches(tag_lang, batch_format="pyarrow",
                                 zero_copy_batch=True))
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Max("logit_ppm", alias_name="logit_ppm"),
            ray.data.aggregate.Max("is_en", alias_name="is_en"),
        )
    )

    def binify(t: pa.Table) -> pa.Table:
        b = pc.divide(
            pc.add(t["logit_ppm"], pa.scalar(RELIABILITY_OFFSET,
                                             pa.int64())),
            pa.scalar(RELIABILITY_BIN_WIDTH, pa.int64()),
        )
        return pa.table(
            {
                "bin": pc.cast(b, pa.int64()),
                "n": pa.nulls(len(t), pa.int64()).fill_null(1),
                "n_pos": pc.cast(t["is_en"], pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        ppm = pc.divide(
            pc.multiply(t["n_pos"], pa.scalar(1_000_000, pa.int64())),
            t["n"],
        )
        return pa.table(
            {
                "bin": pc.cast(t["bin"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
                "n_pos": pc.cast(t["n_pos"], pa.int64()),
                "pos_ppm": pc.cast(ppm, pa.int64()),
            }
        )

    return (
        merged.map_batches(binify, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("bin")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("n_pos", alias_name="n_pos"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def score_reliability_oracle_sql() -> str:
    lg = ORACLES["quality_logit"]
    return f"""
with lg as ({lg}),
j as (
  select lg.doc_id, lg.logit_ppm,
         case when d.lang = 'en' then 1 else 0 end as is_en
  from lg join documents d using (doc_id)),
b as (
  select (logit_ppm + {RELIABILITY_OFFSET}) // {RELIABILITY_BIN_WIDTH}
           as bin,
         is_en
  from j)
select bin, count(*)::bigint as n, sum(is_en)::bigint as n_pos,
       (sum(is_en) * 1000000 // count(*))::bigint as pos_ppm
from b group by bin
"""


DF_STOPWORD_PCT = 30  # document-frequency threshold (percent of corpus)


def q_df_stopwords(sf_dir: str):
    """Data-driven stopword discovery: terms whose document frequency
    exceeds DF_STOPWORD_PCT% of the corpus — the corpus-specific
    high-df list a retrieval or tokenizer pipeline derives instead of
    importing someone else's stopwords (a term in a third of all web
    pages carries ~no retrieval signal; cf. the prefix-filter's
    df-ordering in setsim). Per-batch DISTINCT (doc, term) explode ->
    salted df count (the _grouped_count shape) -> threshold filter
    against the metadata row count. Output is O(high-df terms)."""
    n_docs = _table_rows(sf_dir, "documents")

    def explode(t: pa.Table) -> pa.Table:
        terms: dict[str, int] = {}
        for s in t["text"].to_pylist():
            seen = set()
            for w in (s or "").split(" "):
                if w and w not in seen:
                    seen.add(w)
                    terms[w] = terms.get(w, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(terms.keys()), pa.string()),
                "df": pa.array(list(terms.values()), pa.int64()),
            }
        )

    df = _grouped_sum_str(
        _read(sf_dir, "documents", ["text"]).map_batches(
            explode, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="term", val="df", out="df", n_parts=16,
    )
    # df*100 >= PCT*n  <=>  df >= ceil(PCT*n/100); Ray's filter-expr
    # parser takes a bare column on the left, so precompute the constant
    df_min = -(-DF_STOPWORD_PCT * n_docs // 100)
    return df.filter(
        expr=f"df >= {df_min}"
    ).map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "df": pc.cast(t["df"], pa.int64()),
                "df_ppm": pc.cast(
                    pc.divide(
                        pc.multiply(t["df"],
                                    pa.scalar(1_000_000, pa.int64())),
                        pa.scalar(n_docs, pa.int64()),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


DF_STOPWORDS_SQL = f"""
with tf as (
  select term, count(distinct doc_id)::bigint as df
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '' group by term),
n as (select count(*)::bigint as n_docs from documents)
select term, df,
       (df * 1000000 // (select n_docs from n))::bigint as df_ppm
from tf
where df * 100 >= {DF_STOPWORD_PCT} * (select n_docs from n)
"""



PROPS_K_RE = r'"k": (?P<k>\d+)'


def q_props_extract(sf_dir: str):
    """Semi-structured payload extraction over the REAL scaled events
    table: pull the integer property out of each event's JSON ``props``
    string with one vectorized RE2 kernel (no Python per row — the
    payloads are machine-written, so the regex fast path is exact; a
    crawl pipeline falls back to a JSON parse only for rows the regex
    misses) and roll up per event_type: count, sum, max, and distinct-k
    (per-batch pre-distinct -> grouped count, the combiner shape). The
    oracle re-extracts with DuckDB's real JSON parser — a green hash
    proves the fast path IS the JSON semantics for this payload."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=PROPS_K_RE)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return (
            pa.table({"event_type": t["event_type"], "k": k})
            .group_by(["event_type", "k"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "k", "n"])
        )

    per_k = (
        ds.map_batches(extract, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["event_type", "k"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("k", "count"), ("k", "max")]
        )
        g = g.rename_columns(["event_type", "n_events", "n_distinct_k",
                              "max_k"])
        ksum = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "kn": pc.multiply(t["k"], t["n"]),
                }
            )
            .group_by("event_type")
            .aggregate([("kn", "sum")])
            .rename_columns(["event_type", "sum_k"])
        )
        idx = {v: i for i, v in enumerate(ksum["event_type"].to_pylist())}
        order = [idx[v] for v in g["event_type"].to_pylist()]
        return pa.table(
            {
                "event_type": g["event_type"],
                "n_events": pc.cast(g["n_events"], pa.int64()),
                "n_distinct_k": pc.cast(g["n_distinct_k"], pa.int64()),
                "max_k": pc.cast(g["max_k"], pa.int64()),
                "sum_k": pc.cast(
                    pc.take(ksum["sum_k"], pa.array(order)), pa.int64()
                ),
            }
        )

    return (
        per_k.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("n_events", alias_name="n_events"),
            ray.data.aggregate.Sum("n_distinct_k",
                                   alias_name="n_distinct_k"),
            ray.data.aggregate.Max("max_k", alias_name="max_k"),
            ray.data.aggregate.Sum("sum_k", alias_name="sum_k"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t["event_type"],
                    "n_events": pc.cast(t["n_events"], pa.int64()),
                    "n_distinct_k": pc.cast(t["n_distinct_k"], pa.int64()),
                    "max_k": pc.cast(t["max_k"], pa.int64()),
                    "sum_k": pc.cast(t["sum_k"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


PROPS_EXTRACT_SQL = """
with e as (
  select event_type, json_extract(props, '$.k')::bigint as k from events)
select event_type, count(*)::bigint as n_events,
       count(distinct k)::bigint as n_distinct_k,
       max(k)::bigint as max_k,
       sum(k)::bigint as sum_k
from e group by event_type
"""


Q5_REGION = "ASIA"


def q_q5_local_supplier(sf_dir: str):
    """The canonical snowflake join tree (TPC-H Q5, local supplier
    volume): revenue per nation where the CUSTOMER and the SUPPLIER sit
    in the same nation of one region — the query shape that exercises
    every join strategy at once, sized per side: region/nation are
    broadcast dicts (constant), supplier is a broadcast map keyed by
    suppkey (the smallest scaled table — past its cap the same column
    flips to a bucketed join like everything else), orders⋈customer
    and lineitem are the two corpus-scaled sides co-located by ONE
    bucketed hash join on orderkey. Revenue is the integer-cent exact
    sum (the join_bloom_prefilter arithmetic)."""
    import pandas as pd

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = set(
        reg.loc[reg["r_name"] == Q5_REGION, "r_regionkey"].astype(int)
    )
    nat_in = {
        int(r["n_nationkey"]): r["n_name"]
        for _, r in nat.iterrows()
        if int(r["n_regionkey"]) in asia
    }
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup_nat = {
        int(k): int(n)
        for k, n in zip(sup["s_suppkey"], sup["s_nationkey"])
        if int(n) in nat_in
    }
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cust_nat = {
        int(k): int(n)
        for k, n in zip(cust["c_custkey"], cust["c_nationkey"])
        if int(n) in nat_in
    }
    # NOTE: customer fits the broadcast budget at bench scale; the
    # 100 TB route replaces this dict with a bucketed orders⋈customer
    # join, identical shape to the orderkey join below.
    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    def tag_orders(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_pylist()
        ck = t["o_custkey"].to_pylist()
        rows = [
            (o, cust_nat[c]) for o, c in zip(ok, ck) if c in cust_nat
        ]
        return pa.table(
            {
                "bucket": pa.array(
                    [o & (JOIN_BUCKETS - 1) for o, _ in rows], pa.int64()
                ),
                "key": pa.array([o for o, _ in rows], pa.int64()),
                "c_nat": pa.array([n for _, n in rows], pa.int64()),
                "s_nat": pa.array([-1] * len(rows), pa.int64()),
                "micro": pa.array([0] * len(rows), pa.int64()),
                "side": pa.array(["o"] * len(rows), pa.string()),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        lk = t["l_orderkey"].to_pylist()
        sk = t["l_suppkey"].to_pylist()
        price = t["l_extendedprice"].to_pylist()
        disc = t["l_discount"].to_pylist()
        rows = [
            (o, sup_nat[s],
             round(p * 100) * (100 - round(d * 100)))
            for o, s, p, d in zip(lk, sk, price, disc)
            if s in sup_nat
        ]
        return pa.table(
            {
                "bucket": pa.array(
                    [o & (JOIN_BUCKETS - 1) for o, _, _ in rows], pa.int64()
                ),
                "key": pa.array([o for o, _, _ in rows], pa.int64()),
                "c_nat": pa.array([-1] * len(rows), pa.int64()),
                "s_nat": pa.array([n for _, n, _ in rows], pa.int64()),
                "micro": pa.array([m for _, _, m in rows], pa.int64()),
                "side": pa.array(["l"] * len(rows), pa.string()),
            }
        )

    both = od.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "o"][["key", "c_nat"]]
        right = g[g["side"] == "l"][["key", "s_nat", "micro"]]
        m = left.merge(right, on="key", how="inner")
        m = m[m["c_nat"] == m["s_nat"]]
        if m.empty:
            return pd.DataFrame(
                {"nat": pd.Series([], dtype="int64"),
                 "micro": pd.Series([], dtype="int64")}
            )
        return m.groupby("c_nat", as_index=False).agg(
            micro=("micro", "sum")
        ).rename(columns={"c_nat": "nat"})

    agg = (
        both.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("nat")
        .aggregate(ray.data.aggregate.Sum("micro", alias_name="micro"))
        .to_pandas()
    )
    agg["n_name"] = agg["nat"].map(nat_in)
    agg["revenue"] = ((agg["micro"] + 50) // 100) / 100.0
    return agg[["n_name", "revenue"]]


Q5_SQL = f"""
select n_name,
       ((sum(cast(round(l_extendedprice * 100) as bigint)
             * (100 - cast(round(l_discount * 100) as bigint))) + 50)
        // 100) / 100.0 as revenue
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = '{Q5_REGION}'
group by n_name
"""



def schema_drift_fixture() -> tuple[str, str]:
    """Two deterministic parquet snapshots with drifted schemas (column
    added, column removed, physical type changed) for q_schema_drift;
    idempotent fixed paths."""
    import tempfile

    import pyarrow.parquet as pq_

    root = os.path.join(tempfile.gettempdir(), "aper_schema_drift")
    a_path = os.path.join(root, "a", "part-0.parquet")
    b_path = os.path.join(root, "b", "part-0.parquet")
    if not (os.path.exists(a_path) and os.path.exists(b_path)):
        os.makedirs(os.path.dirname(a_path), exist_ok=True)
        os.makedirs(os.path.dirname(b_path), exist_ok=True)
        pq_.write_table(
            pa.table(
                {
                    "url": pa.array(["https://a.example/0"], pa.string()),
                    "score": pa.array([10], pa.int64()),
                    "depth": pa.array([1], pa.int32()),
                    "fetch_ts": pa.array([1700000000], pa.int64()),
                }
            ),
            a_path,
        )
        pq_.write_table(
            pa.table(
                {
                    "url": pa.array(["https://a.example/0"], pa.string()),
                    "score": pa.array([10.5], pa.float64()),
                    "fetch_ts": pa.array([1700000100], pa.int64()),
                    "lang": pa.array(["en"], pa.string()),
                }
            ),
            b_path,
        )
    return os.path.dirname(a_path), os.path.dirname(b_path)


def q_schema_drift(sf_dir: str):
    """Schema-drift audit between two dataset snapshots — the
    lake-maintenance check run before an incremental job appends to an
    existing table: per column, whether it was added, removed, kept, or
    changed PHYSICAL parquet type between snapshots. Footer-metadata
    only (zero data rows read — the rowgroup_prune discipline); the
    oracle reads the same footers through DuckDB's ``parquet_schema``,
    so the type names are the parquet spec's, not either engine's."""
    import pyarrow.parquet as pq_

    a_dir, b_dir = schema_drift_fixture()

    def physical(d: str) -> dict[str, str]:
        path = os.path.join(d, os.listdir(d)[0])
        s = pq_.ParquetFile(path).schema
        return {s.column(i).name: s.column(i).physical_type
                for i in range(len(s.names))}

    sa, sb = physical(a_dir), physical(b_dir)
    cols = sorted(set(sa) | set(sb))
    status = []
    for c in cols:
        if c not in sb:
            status.append("removed")
        elif c not in sa:
            status.append("added")
        elif sa[c] != sb[c]:
            status.append("type_changed")
        else:
            status.append("unchanged")
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "type_a": pa.array([sa.get(c, "") for c in cols], pa.string()),
            "type_b": pa.array([sb.get(c, "") for c in cols], pa.string()),
            "status": pa.array(status, pa.string()),
        }
    )


def schema_drift_oracle_sql(a_dir: str, b_dir: str) -> str:
    return f"""
with sa as (
  select name, type from parquet_schema('{a_dir}/*.parquet')
  where type is not null),
sb as (
  select name, type from parquet_schema('{b_dir}/*.parquet')
  where type is not null)
select coalesce(sa.name, sb.name) as column,
       coalesce(sa.type, '') as type_a,
       coalesce(sb.type, '') as type_b,
       case when sb.name is null then 'removed'
            when sa.name is null then 'added'
            when sa.type <> sb.type then 'type_changed'
            else 'unchanged' end as status
from sa full outer join sb on sa.name = sb.name
"""


SEASONAL_LAG_DAYS = 7


def q_seasonal_backtest(sf_dir: str):
    """Seasonal-naive forecast backtest: predict each day's per-type
    event volume as the SAME WEEKDAY last week and score MAPE over the
    days where both sides exist — the one-op sanity baseline every
    volume-forecasting pipeline must beat before any model ships.
    Dataflow: per-(type, day) counts (one combiner groupby), the count
    table fans itself forward 7 days as predictions, one bounded
    groupby((type, day)) pairs actual with prediction, and an O(types)
    rollup yields n_days + integer-exact MAPE ppm (per-day terms
    floor-divide by the actual, then the mean floor-divides — order
    fixed and replayed in SQL)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def to_day_counts(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        di = pc.divide(pc.cast(day, pa.int64()),
                       pa.scalar(86_400_000_000, pa.int64()))
        part = (
            pa.table({"event_type": t["event_type"], "day_i": di})
            .group_by(["event_type", "day_i"])
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["event_type", "day_i", "n"])

    counts = (
        ds.map_batches(to_day_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["event_type", "day_i"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .materialize()
    )

    def as_actual(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "event_type": t["event_type"],
                "day_i": pc.cast(t["day_i"], pa.int64()),
                "actual": pc.cast(t["n"], pa.int64()),
                "pred": z,
            }
        )

    def as_pred(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "event_type": t["event_type"],
                "day_i": pc.add(pc.cast(t["day_i"], pa.int64()),
                                pa.scalar(SEASONAL_LAG_DAYS, pa.int64())),
                "actual": z,
                "pred": pc.cast(t["n"], pa.int64()),
            }
        )

    merged = (
        counts.map_batches(as_actual, batch_format="pyarrow",
                           zero_copy_batch=True)
        .union(counts.map_batches(as_pred, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .groupby(["event_type", "day_i"])
        .aggregate(
            ray.data.aggregate.Sum("actual", alias_name="actual"),
            ray.data.aggregate.Sum("pred", alias_name="pred"),
        )
    )

    def terms(t: pa.Table) -> pa.Table:
        et, n1, ape = [], [], []
        for e, a, p in zip(t["event_type"].to_pylist(),
                           t["actual"].to_pylist(),
                           t["pred"].to_pylist()):
            if a > 0 and p > 0:  # both sides exist for this day
                et.append(e)
                n1.append(1)
                ape.append(abs(a - p) * 1_000_000 // a)
        return pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "n_days": pa.array(n1, pa.int64()),
                "ape": pa.array(ape, pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_days": pc.cast(t["n_days"], pa.int64()),
                "mape_ppm": pc.cast(
                    pc.divide(t["ape"], t["n_days"]), pa.int64()
                ),
            }
        )

    return (
        merged.map_batches(terms, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("n_days", alias_name="n_days"),
            ray.data.aggregate.Sum("ape", alias_name="ape"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


SEASONAL_BACKTEST_SQL = f"""
with c as (
  select event_type, (epoch(ts::date)::bigint // 86400) as day_i,
         count(*)::bigint as n
  from events group by 1, 2),
j as (
  select a.event_type,
         abs(a.n - p.n) * 1000000 // a.n as ape
  from c a join c p on p.event_type = a.event_type
                   and p.day_i = a.day_i - {SEASONAL_LAG_DAYS})
select event_type, count(*)::bigint as n_days,
       (sum(ape) // count(*))::bigint as mape_ppm
from j group by event_type
"""



def q_ship_delay_stats(sf_dir: str):
    """Fulfillment-latency distribution: days between order placement
    and line shipment, exact p50/p90 per order priority — the SLA
    report every fulfillment pipeline ends in, and a second user of
    the histogram-of-values order-statistic plan (global_quantiles):
    after one bucketed orderkey join, the shuffle carries (priority,
    delay-day) COUNTERS — the value domain (priorities x ~120 days),
    never the join rows — and the driver reads order statistics off
    the tiny per-priority cumsums."""
    import pandas as pd

    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    # the side tag rides in the SIGN of the date columns (-1 = absent),
    # so the 2x-corpus-sized shuffle carries three ints + one dictionary
    # string per row and no side/null columns
    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["o_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["o_orderkey"], pa.int64()),
                "prio": t["o_orderpriority"],
                "odate": pc.cast(pc.cast(t["o_orderdate"], pa.int64()),
                                 pa.int64()),
                "sdate": pa.nulls(len(t), pa.int64()).fill_null(-1),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["l_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["l_orderkey"], pa.int64()),
                "prio": pa.nulls(len(t), pa.string()),
                "odate": pa.nulls(len(t), pa.int64()).fill_null(-1),
                "sdate": pc.cast(pc.cast(t["l_shipdate"], pa.int64()),
                                 pa.int64()),
            }
        )

    both = od.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow")
    )
    us_day = 86_400_000_000

    def hist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["odate"] >= 0][["key", "prio", "odate"]]
        right = g[g["sdate"] >= 0][["key", "sdate"]]
        m = left.merge(right, on="key", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"prio": pd.Series([], dtype="object"),
                 "delay": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        m["delay"] = (m["sdate"] - m["odate"]) // us_day
        return m.groupby(["prio", "delay"], as_index=False).size()\
            .rename(columns={"size": "n"})

    partials = both.groupby("bucket").map_groups(
        hist_bucket, batch_format="pandas"
    )

    # final (prio, delay) counter merge via salted Arrow C++ group_by —
    # Dataset.groupby().aggregate(Sum) combines the ~160k partial
    # histogram rows at Python speed (22 s of the op's 26 s at sf0.1);
    # this pass is ~1 s
    n_parts = 64

    def salt(t: pa.Table) -> pa.Table:
        p = pc.bit_wise_and(t["delay"], n_parts - 1)
        return t.append_column("p", pc.cast(p, pa.int64()))

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"prio": pa.array([], pa.string()),
                 "delay": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        r = (
            g.select(["prio", "delay", "n"])
            .group_by(["prio", "delay"])
            .aggregate([("n", "sum")])
        )
        return r.rename_columns(["prio", "delay", "n"])

    hist = (
        partials.map_batches(salt, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("p")
        .map_groups(reduce_part, batch_format="pyarrow")
        .to_pandas()  # O(priorities x delay-day domain)
    )
    out_p, out_n, out_p50, out_p90 = [], [], [], []
    for prio, grp in hist.groupby("prio"):
        grp = grp.sort_values("delay")
        counts = grp["n"].to_numpy(dtype=np.int64)
        vals = grp["delay"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        out_p.append(prio)
        out_n.append(n)
        out_p50.append(int(vals[np.searchsorted(cum, ((n - 1) * 1) // 2
                                                + 1, side="left")]))
        out_p90.append(int(vals[np.searchsorted(cum, ((n - 1) * 9) // 10
                                                + 1, side="left")]))
    return pa.table(
        {
            "priority": pa.array(out_p, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "p50_days": pa.array(out_p50, pa.int64()),
            "p90_days": pa.array(out_p90, pa.int64()),
        }
    )


SHIP_DELAY_SQL = """
with j as (
  select o_orderpriority as p,
         datediff('day', o_orderdate, l_shipdate)::bigint as d
  from orders join lineitem on l_orderkey = o_orderkey),
o as (
  select p, d, row_number() over (partition by p order by d) - 1 as r
  from j),
n as (select p, count(*)::bigint as c from j group by p)
select n.p as priority, n.c as n,
       (select d from o where o.p = n.p and o.r = ((n.c - 1) * 1) // 2)
         ::bigint as p50_days,
       (select d from o where o.p = n.p and o.r = ((n.c - 1) * 9) // 10)
         ::bigint as p90_days
from n
"""


def q_centroid_distances(sf_dir: str):
    """Pairwise distance matrix between per-label embedding centroids —
    the class-geometry audit (which labels are confusable BEFORE any
    classifier is trained): composes the existing label_centroids
    combiner plan (shuffle = O(labels x blocks) partials, never
    vectors), pivots the O(labels x dim) long table on the driver, and
    emits round-6 Euclidean distances over the ROUNDED centroids (same
    values the oracle's avg sees, so the arithmetic is shared, not
    approximately equal)."""
    cen = q_label_centroids(sf_dir).to_pandas()  # O(labels x dim)
    piv = cen.pivot(index="label", columns="pos", values="value")
    labels = sorted(piv.index)
    M = piv.loc[labels].to_numpy(dtype=np.float64)
    la, lb, dist = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            d = float(np.sqrt(np.sum((M[i] - M[j]) ** 2)))
            la.append(int(labels[i]))
            lb.append(int(labels[j]))
            dist.append(round(d, 6))
    return pa.table(
        {
            "label_a": pa.array(la, pa.int64()),
            "label_b": pa.array(lb, pa.int64()),
            "dist": pa.array(dist, pa.float64()),
        }
    )


def centroid_distances_oracle_sql() -> str:
    return f"""
with c as ({ORACLES["label_centroids"]}),
d as (
  select a.label as label_a, b.label as label_b,
         sum((a.value - b.value) * (a.value - b.value)) as ss
  from c a join c b on a.pos = b.pos and a.label < b.label
  group by 1, 2)
select label_a::bigint as label_a, label_b::bigint as label_b,
       round(sqrt(ss), 6) as dist
from d
"""



def q_brand_return_rates(sf_dir: str):
    """Per-brand return-rate rollup (the product-quality signal a
    marketplace pipeline feeds back into ranking): lineitems join the
    part dimension and aggregate returns ('R' returnflag) per brand.
    The dimension ships ONCE as a broadcast partkey→brand map (the
    ray.put-once / read-per-actor discipline — part is the classic
    broadcast side; past the budget the same column flips to a
    bucketed join); the fact table contributes per-batch (brand,
    n, n_returned) partials, so the shuffle is O(brands x blocks)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    bref = ray.put(
        dict(zip((int(k) for k in part["p_partkey"]), part["p_brand"]))
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        brand_of = ray.get(bref)
        agg: dict[str, list] = {}
        for pk, rf in zip(t["l_partkey"].to_pylist(),
                          t["l_returnflag"].to_pylist()):
            b = brand_of[pk]
            a = agg.setdefault(b, [0, 0])
            a[0] += 1
            if rf == "R":
                a[1] += 1
        brands = sorted(agg)
        return pa.table(
            {
                "brand": pa.array(brands, pa.string()),
                "n": pa.array([agg[b][0] for b in brands], pa.int64()),
                "n_returned": pa.array([agg[b][1] for b in brands],
                                       pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        ppm = pc.divide(
            pc.multiply(t["n_returned"], pa.scalar(1_000_000, pa.int64())),
            t["n"],
        )
        return pa.table(
            {
                "brand": t["brand"],
                "n": pc.cast(t["n"], pa.int64()),
                "n_returned": pc.cast(t["n_returned"], pa.int64()),
                "return_ppm": pc.cast(ppm, pa.int64()),
            }
        )

    return (
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("brand")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("n_returned", alias_name="n_returned"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


BRAND_RETURN_SQL = """
select p_brand as brand, count(*)::bigint as n,
       sum(case when l_returnflag = 'R' then 1 else 0 end)::bigint
         as n_returned,
       (sum(case when l_returnflag = 'R' then 1 else 0 end) * 1000000
        // count(*))::bigint as return_ppm
from lineitem join part on l_partkey = p_partkey
group by p_brand
"""


def q_part_supply_risk(sf_dir: str):
    """Single-source supply-risk audit: how many DISTINCT suppliers has
    each part actually shipped from, rolled up into a risk histogram
    (n_parts per supplier-count, plus the single-sourced cohort a
    procurement pipeline escalates). Two bounded combiner groupbys:
    per-batch distinct (part, supplier) -> grouped distinct count per
    part (shuffle = distinct pairs, not lineitems) -> O(distinct
    counts) histogram."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        part = t.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        return part.rename_columns(["part", "supp"])

    per_part = (
        li.map_batches(distinct_pairs, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["part", "supp"])
        .count()
        .select_columns(["part", "supp"])
        .groupby("part")
        .aggregate(ray.data.aggregate.Count(alias_name="n_suppliers"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        part = t.select(["n_suppliers"]).group_by("n_suppliers")\
            .aggregate([([], "count_all")])
        return part.rename_columns(["n_suppliers", "n_parts"])

    return (
        per_part.map_batches(hist_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("n_suppliers")
        .aggregate(ray.data.aggregate.Sum("n_parts", alias_name="n_parts"))
        .map_batches(
            lambda t: pa.table(
                {
                    "n_suppliers": pc.cast(t["n_suppliers"], pa.int64()),
                    "n_parts": pc.cast(t["n_parts"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


PART_SUPPLY_RISK_SQL = """
with ps as (
  select l_partkey, count(distinct l_suppkey)::bigint as n_suppliers
  from lineitem group by 1)
select n_suppliers, count(*)::bigint as n_parts
from ps group by n_suppliers
"""



FISHER_TOP_K = 10


def q_fisher_dims(sf_dir: str):
    """Per-dimension Fisher score over the labeled embeddings —
    between-class vs within-class variance per coordinate, the
    classical filter-method feature selector run before any projection
    is trusted: a dimension that separates the label clusters scores
    high, noise dims score ~0. One combiner pass emits per-(label)
    partial moment rows (sum, sum-of-squares, count per dim — the
    O(d²)-free sibling of embed_covariance's plan); the driver finishes
    on the O(labels x dim) moment table and returns the top-K dims by
    round-6 score (ties -> lower dim index). The oracle recomputes the
    same decomposition from raw unnested values."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        labels = np.asarray(t["label"].to_pylist())
        out_l, out_s, out_q, out_n = [], [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.append(int(lab))
            out_s.append(X[m].sum(axis=0).tolist())
            out_q.append((X[m] ** 2).sum(axis=0).tolist())
            out_n.append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "vsum": pa.array(out_s, pa.list_(pa.float64())),
                "vsq": pa.array(out_q, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("label")
        .map_groups(
            lambda g: pa.table(
                {
                    "label": g["label"].slice(0, 1),
                    "vsum": pa.array(
                        [np.asarray(g["vsum"].to_pylist())
                         .sum(axis=0).tolist()],
                        pa.list_(pa.float64()),
                    ),
                    "vsq": pa.array(
                        [np.asarray(g["vsq"].to_pylist())
                         .sum(axis=0).tolist()],
                        pa.list_(pa.float64()),
                    ),
                    "n": pa.array(
                        [int(pc.sum(g["n"]).as_py())], pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )  # O(labels) rows of dim-length moment vectors
    S = np.asarray([r["vsum"] for r in rows], dtype=np.float64)
    Q = np.asarray([r["vsq"] for r in rows], dtype=np.float64)
    N = np.asarray([r["n"] for r in rows], dtype=np.float64)[:, None]
    n_tot = float(N.sum())
    mu_l = S / N                       # (L, d) class means
    mu = S.sum(axis=0) / n_tot         # (d,) global mean
    between = (N * (mu_l - mu) ** 2).sum(axis=0) / n_tot
    within = ((Q - N * mu_l**2).sum(axis=0)) / n_tot
    score = np.round(between / within, 6)
    order = sorted(range(len(score)), key=lambda i: (-score[i], i))
    keep = order[:FISHER_TOP_K]
    return pa.table(
        {
            "pos": pa.array([i + 1 for i in keep], pa.int64()),
            "fisher": pa.array([float(score[i]) for i in keep],
                               pa.float64()),
        }
    )


FISHER_SQL = f"""
with flat as (
  select label, unnest(embedding) as v,
         generate_subscripts(embedding, 1) as pos
  from embeddings),
lm as (
  select label, pos, sum(v) as s, sum(v * v) as q,
         count(*)::double as n
  from flat group by 1, 2),
g as (select pos, sum(s) / sum(n) as mu, sum(n) as n_tot
      from lm group by pos),
f as (
  select lm.pos,
         sum(lm.n * (lm.s / lm.n - g.mu) * (lm.s / lm.n - g.mu))
           / max(g.n_tot) as between_v,
         sum(lm.q - lm.n * (lm.s / lm.n) * (lm.s / lm.n))
           / max(g.n_tot) as within_v
  from lm join g using (pos) group by lm.pos),
sc as (select pos, round(between_v / within_v, 6) as fisher from f),
r as (select pos, fisher,
             row_number() over (order by fisher desc, pos) as rn
      from sc)
select pos::bigint as pos, fisher from r where rn <= {FISHER_TOP_K}
"""


TRIGRAM_TOP_K = 15


def q_event_trigrams(sf_dir: str):
    """Frequent behavioral motifs: the top-K 3-event sequences over
    per-user time-ordered streams (event_transitions' order-3 sibling —
    bigrams miss the signup→view→purchase vs signup→error→purchase
    distinction that matters for funnel debugging). Per-user groups are
    bounded by a user's event count; the motif rollup shuffles (a, b,
    c, n) counters; top-K via the per-block-partial dataset_topk
    reduce. Ties break lexicographically — replayed identically in
    SQL's double-lag formulation."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        ev = pc.take(g["event_type"], order).to_pylist()
        from collections import Counter

        c = Counter(zip(ev, ev[1:], ev[2:]))
        return pa.table(
            {
                "a": pa.array([k[0] for k in c], pa.string()),
                "b": pa.array([k[1] for k in c], pa.string()),
                "c": pa.array([k[2] for k in c], pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    from ..stages.topk import dataset_topk

    counts = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["a", "b", "c"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "a": t["a"], "b": t["b"], "c": t["c"],
                    "n": pc.cast(t["n"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    return dataset_topk(
        counts,
        sort_keys=[("n", "descending"), ("a", "ascending"),
                   ("b", "ascending"), ("c", "ascending")],
        k=TRIGRAM_TOP_K,
    )


EVENT_TRIGRAMS_SQL = f"""
with o as (
  select user_id, event_type,
         lag(event_type, 1) over w as prev1,
         lag(event_type, 2) over w as prev2
  from events
  window w as (partition by user_id order by ts, event_id)),
t as (
  select prev2 as a, prev1 as b, event_type as c, count(*)::bigint as n
  from o where prev2 is not null
  group by 1, 2, 3)
select a, b, c, n from t
order by n desc, a, b, c limit {TRIGRAM_TOP_K}
"""



SIMHASH_IDF_VOCAB_CAP = 5_000_000  # broadcast budget for the idf table


def q_simhash_idf(sf_dir: str):
    """IDF-WEIGHTED SimHash signatures — the production variant of
    dedup_simhash (Manku et al. use term weights, not ±1): every token
    occurrence votes ±floor(1000·ln(N/df)) per bit, so boilerplate
    tokens that appear in every doc (df == N → weight 0) stop dragging
    unrelated pages into Hamming range, which is exactly the failure
    mode the unweighted signature has on templated web corpora. The df
    table comes from the salted distinct-count pass and ships once via
    ray.put (within SIMHASH_IDF_VOCAB_CAP — past it, the same weight
    attach becomes a token-keyed join, the setsim routing); signatures
    and 16-bit bands come out in the dedup_simhash layout so the whole
    banding/verify chain downstream is reusable unchanged. Weight
    arithmetic is integer (floor) on both sides; the oracle replays
    hash, weight, vote and band bit-for-bit."""
    import math

    n_docs = _table_rows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def distinct_tokens(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for s in t["text"].to_pylist():
            for tok in set(dd._tokens(s or "")):
                cnt[tok] = cnt.get(tok, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(cnt.keys()), pa.string()),
                "df": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    df_tbl = _grouped_sum_str(
        docs.map_batches(distinct_tokens, batch_format="pyarrow",
                         zero_copy_batch=True),
        key="term", val="df", out="df", n_parts=16,
    ).take_all()  # O(vocabulary) — within the broadcast cap by contract
    weights = {
        r["term"]: int(math.floor(math.log(n_docs / r["df"]) * 1000))
        for r in df_tbl
    }
    wref = ray.put(weights)

    def sign(t: pa.Table) -> pa.Table:
        w = ray.get(wref)
        sigs = []
        for s in t["text"].to_pylist():
            toks = dd._tokens(s or "")
            if not toks:
                sigs.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = dd._hash64(tok)
                wt = w[tok]
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)
                        ) & np.uint64(1)
                acc += np.where(bits.astype(bool), wt, -wt)
            out = 0
            for i in np.nonzero(acc > 0)[0]:
                out |= 1 << int(i)
            sigs.append(out)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(sigs, pa.uint64()),
                **{
                    f"band{b}": pa.array(
                        [(s >> (16 * b)) & 0xFFFF for s in sigs],
                        pa.int64(),
                    )
                    for b in range(4)
                },
            }
        )

    return docs.map_batches(sign, batch_format="pyarrow",
                            zero_copy_batch=True)


def simhash_idf_oracle_sql() -> str:
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with tk as (
  select doc_id, unnest({tokenize}) as t from documents),
dft as (select t, count(distinct doc_id)::bigint as df from tk group by t),
w as (
  select t,
         floor(ln((select count(*) from documents)::double / df) * 1000)
           ::bigint as wt
  from dft),
th as (
  select tk.doc_id,
         ('0x' || substr(md5(tk.t), 1, 16))::ubigint as h, w.wt
  from tk join w using (t)),
bitix(bit) as (select unnest(range(64))),
bits as (
  select doc_id, bit,
         sum(case when (h >> bit) & 1 = 1 then wt else -wt end) as acc
  from th cross join bitix group by doc_id, bit),
sim as (
  select doc_id,
         sum(case when acc > 0 then (1::hugeint << bit)
             else 0::hugeint end)::ubigint as simhash
  from bits group by doc_id)
select doc_id, simhash,
       ((simhash >> 0) & 65535)::bigint as band0,
       ((simhash >> 16) & 65535)::bigint as band1,
       ((simhash >> 32) & 65535)::bigint as band2,
       ((simhash >> 48) & 65535)::bigint as band3
from sim
"""


def q_simhash_hamming_hist(sf_dir: str):
    """Hamming-distance histogram of the SimHash candidate pairs — the
    threshold-selection evidence for the band dedup (where does the
    near-dup mass sit inside the distance budget the 4×16 pigeonhole
    guarantees?). A pure O(4)-row rollup of the existing verified pair
    stream; zero new shuffles beyond the pair chain's own."""
    pairs = _simhash_band_pairs(sf_dir)
    return (
        pairs.groupby("hamming")
        .aggregate(ray.data.aggregate.Count(alias_name="n_pairs"))
        .map_batches(
            lambda t: pa.table(
                {
                    "hamming": pc.cast(t["hamming"], pa.int64()),
                    "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )



TOKEN_QUOTA_B = 300  # per-source token budget


def q_token_quota(sf_dir: str):
    """TOKEN-budget quota sampling per source — the mixing step where
    budgets are what training actually consumes (tokens), not document
    counts (domain_quota's unit): within each source, rank docs
    quality-first (stop_ratio desc, doc_id tie-break) and keep the
    prefix whose INCLUSIVE cumulative token count fits TOKEN_QUOTA_B.
    The running sum uses the per-source rank decomposition
    (score_calibrate's shape) extended to carry token sums: the
    per-(source, score, id-bucket) table holds each group's token
    total, the driver prefix-sums those into base offsets (O(distinct
    keys), not rows), and each bounded group finishes its own exact
    within-group cumsum. Scores ride as integer micro-units so the
    order key is never a float."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def features(t: pa.Table) -> pa.Table:
        qb = tx.quality_batch(t)  # same row order as the input batch
        sr6 = pc.cast(
            pc.round(pc.multiply(qb["stop_ratio"], 1_000_000.0), 0),
            pa.int64(),
        )
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "n_tokens": qb["n_tokens"],
                "sr6": sr6,
                "bucket": pc.cast(b, pa.int64()),
            }
        )

    feats = docs.map_batches(
        features, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        feats.groupby(["source", "sr6", "bucket"])
        .aggregate(ray.data.aggregate.Sum("n_tokens", alias_name="tok"))
        .take_all()
    )  # O(distinct (source, score, bucket))
    base: dict[tuple[str, int, int], int] = {}
    run: dict[str, int] = {}
    for r in sorted(
        counts, key=lambda r: (r["source"], -r["sr6"], r["bucket"])
    ):
        key = (r["source"], r["sr6"], r["bucket"])
        base[key] = run.get(r["source"], 0)
        run[r["source"]] = base[key] + r["tok"]
    bref = ray.put(base)

    def select(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        start = offsets[(g["source"][0].as_py(), g["sr6"][0].as_py(),
                         g["bucket"][0].as_py())]
        toks = g["n_tokens"].to_numpy(zero_copy_only=False)
        cum = start + np.cumsum(toks)
        keep = cum <= TOKEN_QUOTA_B
        g = g.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "source": g["source"],
                "n_tokens": g["n_tokens"],
                "cum_tokens": pa.array(cum[keep], pa.int64()),
            }
        )

    return feats.groupby(["source", "sr6", "bucket"]).map_groups(
        select, batch_format="pyarrow"
    )


def token_quota_oracle_sql() -> str:
    qs = ORACLES["quality_score"]
    return f"""
with qs as ({qs}),
j as (
  select d.doc_id, d.source, qs.n_tokens,
         cast(round(qs.stop_ratio * 1000000) as bigint) as sr6
  from qs join documents d using (doc_id)),
c as (
  select *, sum(n_tokens) over (
      partition by source order by sr6 desc, doc_id
      rows unbounded preceding) as cum
  from j)
select doc_id, source, n_tokens, cum::bigint as cum_tokens
from c where cum <= {TOKEN_QUOTA_B}
"""


def q_outline_depth_stats(sf_dir: str):
    """Per-page outline-shape rollup over the structured-HTML fixture:
    heading counts per level and the deepest level used — the
    document-structure features a chunking policy keys on (pages with
    h3 depth split differently than flat pages). One vectorized RE2
    count per level, no Python per row, no shuffle."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        h = pc.cast(t["html"], pa.string())
        n1 = pc.cast(pc.count_substring(h, pattern="<h1>"), pa.int64())
        n2 = pc.cast(pc.count_substring(h, pattern="<h2>"), pa.int64())
        n3 = pc.cast(pc.count_substring(h, pattern="<h3>"), pa.int64())
        depth = pc.if_else(
            pc.greater(n3, 0), pa.scalar(3, pa.int64()),
            pc.if_else(pc.greater(n2, 0), pa.scalar(2, pa.int64()),
                       pc.if_else(pc.greater(n1, 0),
                                  pa.scalar(1, pa.int64()),
                                  pa.scalar(0, pa.int64()))),
        )
        return pa.table(
            {
                "url": t["url"],
                "n_h1": n1,
                "n_h2": n2,
                "n_h3": n3,
                "max_level": depth,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def outline_depth_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (select url, decode(html) as s
           from read_parquet('{pages_dir}/*.parquet'))
select url,
       length(s) - length(replace(s, '<h1>', '---'))::bigint as n_h1,
       length(s) - length(replace(s, '<h2>', '---'))::bigint as n_h2,
       length(s) - length(replace(s, '<h3>', '---'))::bigint as n_h3,
       case when contains(s, '<h3>') then 3
            when contains(s, '<h2>') then 2
            when contains(s, '<h1>') then 1
            else 0 end::bigint as max_level
from p
"""



def q_minhash_calibration(sf_dir: str):
    """Estimator calibration for the MinHash Jaccard: bucket the
    128-slot signature ESTIMATE by deciles and report the mean EXACT
    Jaccard inside each bucket — the measurement that justifies (or
    indicts) trusting signature agreement in place of text verification
    at a given threshold (Broder's E[matches/k]=J is unbiased; this op
    shows the realized curve on the actual corpus, where LSH candidate
    conditioning skews it). Both per-pair streams are the EXISTING
    operators (signature-agreement estimate; exact n-gram verify) over
    the same candidate set; they meet in salted hash partitions (one
    pandas merge per partition — never a per-pair Python group) and
    roll up to <= 11 decile rows."""
    import pandas as pd
    import zlib

    est = q_dedup_minhash_est(sf_dir)  # (a, b, est_jaccard)
    exact = q_dedup_jaccard(sf_dir)    # (a, b, jaccard)
    n_parts = 32

    def tag(which: str):
        def f(t: pa.Table) -> pa.Table:
            col = "est_jaccard" if which == "est" else "jaccard"
            p = pc.bit_wise_and(
                pc.add(pc.multiply(pc.cast(t["a"], pa.int64()),
                                   2654435761), t["b"]),
                n_parts - 1,
            )
            return pa.table(
                {
                    "p": pc.cast(p, pa.int64()),
                    "a": pc.cast(t["a"], pa.int64()),
                    "b": pc.cast(t["b"], pa.int64()),
                    "v": pc.cast(t[col], pa.float64()),
                    "kind": pa.array([which] * len(t), pa.string()),
                }
            )

        return f

    both = est.map_batches(tag("est"), batch_format="pyarrow").union(
        exact.map_batches(tag("exact"), batch_format="pyarrow")
    )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == "est"][["a", "b", "v"]]
        x = g[g["kind"] == "exact"][["a", "b", "v"]]
        m = e.merge(x, on=["a", "b"], suffixes=("_e", "_x"))
        if m.empty:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "jppm": pd.Series([], dtype="int64")}
            )
        m["bucket"] = np.floor(m["v_e"] * 10).astype("int64")
        m["jppm"] = (m["v_x"] * 1_000_000).round().astype("int64")
        return m.groupby("bucket", as_index=False).agg(
            n=("jppm", "size"), jppm=("jppm", "sum")
        )

    return (
        both.groupby("p")
        .map_groups(merge_part, batch_format="pandas")
        .groupby("bucket")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n_pairs"),
            ray.data.aggregate.Sum("jppm", alias_name="jppm"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": pc.cast(t["bucket"], pa.int64()),
                    "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
                    "mean_exact_ppm": pc.cast(
                        pc.divide(t["jppm"], t["n_pairs"]), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def minhash_calibration_oracle_sql() -> str:
    return _minhash_cte() + f"""
, sd as (select doc_id, list_distinct(shingles) as sd from sh),
est as (
  select p.a, p.b,
         round(len([i for i in range(1, {dd.NUM_PERM} + 1)
                    if sa.sig[i] = sb.sig[i]])::double / {dd.NUM_PERM}, 6)
           as e
  from pairs p
  join sig sa on sa.doc_id = p.a
  join sig sb on sb.doc_id = p.b),
ex as (
  select p.a, p.b,
         round(len(list_intersect(xa.sd, xb.sd))::double /
               (len(xa.sd) + len(xb.sd)
                - len(list_intersect(xa.sd, xb.sd))), 6) as j
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b),
m as (
  select cast(floor(est.e * 10) as bigint) as bucket,
         cast(round(ex.j * 1000000) as bigint) as jppm
  from est join ex using (a, b))
select bucket, count(*)::bigint as n_pairs,
       (sum(jppm) // count(*))::bigint as mean_exact_ppm
from m group by bucket
"""



CANONICAL_RE = re.compile(r'<link rel="canonical" href="([^"]*)">')


def q_canonical_extract(sf_dir: str):
    """rel=canonical extraction — the duplicate-variant consolidation
    signal crawlers trust above content similarity (the page ITSELF
    declares its canonical): per page, the declared canonical URL and
    whether it is self-referential. Stateless vectorized RE2 extract
    (one named-group kernel call, no Python per row); a downstream
    dedup chain groups by canonical_url exactly like dedup_exact groups
    by content hash, but with zero text compute."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        h = pc.cast(t["html"], pa.string())
        m = pc.extract_regex(
            h, pattern=r'<link rel="canonical" href="(?P<c>[^"]*)">'
        )
        canon = pc.struct_field(m, "c")
        return pa.table(
            {
                "url": t["url"],
                "canonical_url": canon,
                "is_self": pc.cast(
                    pc.equal(t["url"], canon), pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def canonical_extract_oracle_sql(pages_dir: str) -> str:
    return f"""
select url,
       regexp_extract(decode(html),
                      '<link rel="canonical" href="([^"]*)">', 1)
         as canonical_url,
       (url = regexp_extract(decode(html),
              '<link rel="canonical" href="([^"]*)">', 1))::bigint
         as is_self
from read_parquet('{pages_dir}/*.parquet')
"""



def q_gap_exponential_fit(sf_dir: str):
    """Exponential inter-arrival fit per event type — the Poisson-rate
    MLE behind alerting thresholds and capacity planning. The key
    identity: consecutive gaps TELESCOPE, so Σ gaps = max(ts) − min(ts)
    and the MLE λ = (n−1)/span needs NO ordering, no windows, no
    per-entity groups — just Min/Max/Count combiners per type (the
    cheapest possible shuffle: three scalars per type per block). Rate
    is reported as integer milli-events-per-hour; the final arithmetic
    runs driver-side over the O(event-types) rollup in arbitrary-
    precision Python ints (the product overflows int64 at 10^12
    events, as the docstring math notes)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ti = pc.cast(t["ts"], pa.int64())  # microseconds
        g = (
            pa.table({"event_type": t["event_type"], "ti": ti})
            .group_by("event_type")
            .aggregate([("ti", "min"), ("ti", "max"), ("ti", "count")])
        )
        return g.rename_columns(["event_type", "tmin", "tmax", "n"])

    rolled = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Min("tmin", alias_name="tmin"),
            ray.data.aggregate.Max("tmax", alias_name="tmax"),
            ray.data.aggregate.Sum("n", alias_name="n"),
        )
        .take_all()  # O(event types)
    )
    et, nn, span, rate = [], [], [], []
    for r in sorted(rolled, key=lambda r: r["event_type"]):
        s_us = int(r["tmax"]) - int(r["tmin"])
        s_s = s_us // 1_000_000
        n = int(r["n"])
        et.append(r["event_type"])
        nn.append(n)
        span.append(s_s)
        rate.append(
            (n - 1) * 3_600_000 // s_s if s_s > 0 else 0
        )
    return pa.table(
        {
            "event_type": pa.array(et, pa.string()),
            "n_events": pa.array(nn, pa.int64()),
            "span_s": pa.array(span, pa.int64()),
            "rate_meph": pa.array(rate, pa.int64()),
        }
    )


GAP_EXP_FIT_SQL = """
select event_type, count(*)::bigint as n_events,
       ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)::bigint
         as span_s,
       case when (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 > 0
            then ((count(*) - 1) * 3600000)
                 // ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)
            else 0 end::bigint as rate_meph
from events group by event_type
"""


def q_cdc_chunk_stats(sf_dir: str):
    """Chunk-size distribution audit for the CDC dedup: n / total bytes
    / mean (milli-bytes) / exact p50 and p90 chunk length — the check
    that CDC_DIV actually yields the ~64-byte chunks its dedup math
    assumes (a skewed cut distribution silently degrades dedup recall).
    Chunk lengths come from the existing cdc_chunk_batch kernel; the
    length DOMAIN is bounded (a chunk is cut within a few multiples of
    the divisor), so exact order statistics use the histogram-of-values
    plan — counters shuffle, never chunks."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def hist_partial(t: pa.Table) -> pa.Table:
        ch = tx.cdc_chunk_batch(t)
        g = ch.select(["clen"]).group_by("clen").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["chunk_len", "n"])

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("chunk_len")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct chunk lengths)
        .sort_values("chunk_len")
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    vals = hist["chunk_len"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    total = int((counts * vals).sum())

    def at(q_num: int, q_den: int) -> int:
        idx = ((n - 1) * q_num) // q_den
        return int(vals[np.searchsorted(cum, idx + 1, side="left")])

    return pa.table(
        {
            "n_chunks": pa.array([n], pa.int64()),
            "total_bytes": pa.array([total], pa.int64()),
            "mean_len_milli": pa.array([total * 1000 // n], pa.int64()),
            "p50_len": pa.array([at(1, 2)], pa.int64()),
            "p90_len": pa.array([at(9, 10)], pa.int64()),
        }
    )


def cdc_chunk_stats_oracle_sql() -> str:
    base = _rolling_oracle_sql()
    head = base[: base.index("fp as (")]
    return head + f"""
cuts as (
  select r.doc_id, r.t
  from r join s2 using (doc_id)
  where r.t >= s2.w and r.acc % {tx.CDC_DIV} = 0
  union
  select doc_id, n from s2),
ch as (
  select doc_id, t as cut_end,
         lag(t, 1, 0) over (partition by doc_id order by t) as cut_start
  from cuts),
lens as (select cut_end - cut_start as l from ch),
o as (select l, row_number() over (order by l) - 1 as rn from lens),
agg as (select count(*)::bigint as n, sum(l)::bigint as total from lens)
select n as n_chunks, total as total_bytes,
       (total * 1000 // n)::bigint as mean_len_milli,
       (select l from o where rn = ((select n - 1 from agg) * 1) // 2)
         ::bigint as p50_len,
       (select l from o where rn = ((select n - 1 from agg) * 9) // 10)
         ::bigint as p90_len
from agg
"""



KS_SRC_A, KS_SRC_B = "src0", "src1"


def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov distance between two sources'
    length distributions — the drift test a mixing pipeline runs before
    treating two feeds as exchangeable. Exact and integer-valued:
    per-batch (source, value) counters -> one grouped Sum (the shuffle
    is the value domain × 2), the driver evaluates both CDFs on the
    union value grid and maximizes |F_A − F_B| as the cross-multiplied
    integer |c1·N2 − c2·N1| (no float CDFs, so the SQL replay is
    hash-exact). Reports D in ppm plus the value where the supremum is
    attained (min value on ties)."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["source"],
                     value_set=pa.array([KS_SRC_A, KS_SRC_B]))
        )
        g = t.group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "n_chars", "n"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["source", "n_chars"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()
    )  # O(distinct values x 2)
    from collections import defaultdict

    ca: dict[int, int] = defaultdict(int)
    cb: dict[int, int] = defaultdict(int)
    for r in rows:
        (ca if r["source"] == KS_SRC_A else cb)[r["n_chars"]] += r["n"]
    n1, n2 = sum(ca.values()), sum(cb.values())
    best, at = -1, 0
    run1 = run2 = 0
    for v in sorted(set(ca) | set(cb)):
        run1 += ca.get(v, 0)
        run2 += cb.get(v, 0)
        d = abs(run1 * n2 - run2 * n1)
        if d > best:
            best, at = d, v
    return pa.table(
        {
            "n_a": pa.array([n1], pa.int64()),
            "n_b": pa.array([n2], pa.int64()),
            "ks_ppm": pa.array([best * 1_000_000 // (n1 * n2)], pa.int64()),
            "at_value": pa.array([at], pa.int64()),
        }
    )


KS_TEST_SQL = f"""
with f as (
  select source, n_chars from documents
  where source in ('{KS_SRC_A}', '{KS_SRC_B}')),
c as (select source, n_chars, count(*)::bigint as n from f group by 1, 2),
v as (select distinct n_chars from f),
g as (
  select v.n_chars,
         coalesce((select sum(n) from c
                   where source = '{KS_SRC_A}'
                     and c.n_chars <= v.n_chars), 0)::bigint as c1,
         coalesce((select sum(n) from c
                   where source = '{KS_SRC_B}'
                     and c.n_chars <= v.n_chars), 0)::bigint as c2
  from v),
n as (
  select (select count(*) from f where source = '{KS_SRC_A}')::bigint
           as n1,
         (select count(*) from f where source = '{KS_SRC_B}')::bigint
           as n2)
select n.n1 as n_a, n.n2 as n_b,
       ((select max(abs(g.c1 * n.n2 - g.c2 * n.n1)) from g)
        * 1000000 // (n.n1 * n.n2))::bigint as ks_ppm,
       (select g.n_chars from g
        order by abs(g.c1 * n.n2 - g.c2 * n.n1) desc, g.n_chars
        limit 1)::bigint as at_value
from n
"""


CAPS_TOKEN_RE = r"\\b[A-Z]{2,}\\b"


def q_caps_ratio(sf_dir: str):
    """Uppercase-pressure quality features: per-doc uppercase share of
    alphabetic chars (ppm) and the ALL-CAPS token count — the
    shouting/boilerplate signal (nav bars, legal disclaimers, OCR junk)
    that complements the punct/stopword ratios of quality_score. Three
    vectorized RE2 count kernels, no Python per row, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        nu = pc.count_substring_regex(txt, pattern="[A-Z]")
        na = pc.count_substring_regex(txt, pattern="[A-Za-z]")
        nc = pc.count_substring_regex(txt, pattern=r"\b[A-Z]{2,}\b")
        na_safe = pc.max_element_wise(
            pc.cast(na, pa.int64()), pa.scalar(1, pa.int64())
        )
        ppm = pc.divide(
            pc.multiply(pc.cast(nu, pa.int64()),
                        pa.scalar(1_000_000, pa.int64())),
            na_safe,
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_upper": pc.cast(nu, pa.int64()),
                "n_alpha": pc.cast(na, pa.int64()),
                "n_caps_tokens": pc.cast(nc, pa.int64()),
                "upper_ppm": pc.cast(ppm, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


CAPS_RATIO_SQL = """
select doc_id,
       length(regexp_extract_all(text, '[A-Z]'))::bigint as n_upper,
       length(regexp_extract_all(text, '[A-Za-z]'))::bigint as n_alpha,
       length(regexp_extract_all(text, '\\b[A-Z]{2,}\\b'))::bigint
         as n_caps_tokens,
       (length(regexp_extract_all(text, '[A-Z]')) * 1000000
        // greatest(length(regexp_extract_all(text, '[A-Za-z]')), 1))
         ::bigint as upper_ppm
from documents
"""



LOGODDS_ALPHA = 1.0  # symmetric Dirichlet pseudo-count per term
LOGODDS_TOP_K = 10


def q_log_odds_terms(sf_dir: str):
    """Most source-distinctive terms by weighted log-odds with a
    Dirichlet prior (Monroe, Colaresi & Quinn 2008) between the two
    comparison sources — the corpus-comparison op that raw frequency
    ratios get wrong (they over-rank rare terms; the prior and the
    per-term variance fix exactly that). One combiner pass counts
    (source, term) occurrences — the shuffle is vocabulary-sized — and
    the driver finishes the O(vocab) z-score arithmetic: delta =
    ln-odds difference with +alpha smoothing, var = 1/(c1+a) + 1/(c2+a),
    z rounded to 6 dp; top-K by |z| with term tie-break, replayed
    term-for-term in SQL."""
    import math

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["source"], value_set=pa.array([KS_SRC_A, KS_SRC_B]))
        )
        cnt: dict[tuple[str, str], int] = {}
        for src_, s in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for w in (s or "").split(" "):
                if w:
                    cnt[(src_, w)] = cnt.get((src_, w), 0) + 1
        return pa.table(
            {
                "source": pa.array([k[0] for k in cnt], pa.string()),
                "term": pa.array([k[1] for k in cnt], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["source", "term"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()
    )  # O(vocabulary x 2)
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for r in rows:
        (c1 if r["source"] == KS_SRC_A else c2)[r["term"]] = r["n"]
    n1, n2 = sum(c1.values()), sum(c2.values())
    vocab = sorted(set(c1) | set(c2))
    a = LOGODDS_ALPHA
    a0 = a * len(vocab)
    scored = []
    for t in vocab:
        x1, x2 = c1.get(t, 0), c2.get(t, 0)
        delta = math.log((x1 + a) / (n1 + a0 - x1 - a)) - math.log(
            (x2 + a) / (n2 + a0 - x2 - a)
        )
        var = 1.0 / (x1 + a) + 1.0 / (x2 + a)
        scored.append((t, x1, x2, round(delta / math.sqrt(var), 6)))
    scored.sort(key=lambda r: (-abs(r[3]), r[0]))
    top = scored[:LOGODDS_TOP_K]
    return pa.table(
        {
            "term": pa.array([r[0] for r in top], pa.string()),
            "n_a": pa.array([r[1] for r in top], pa.int64()),
            "n_b": pa.array([r[2] for r in top], pa.int64()),
            "z": pa.array([r[3] for r in top], pa.float64()),
        }
    )


def log_odds_oracle_sql() -> str:
    a = LOGODDS_ALPHA
    return f"""
with f as (
  select source, text from documents
  where source in ('{KS_SRC_A}', '{KS_SRC_B}')),
tok as (
  select source, unnest(string_split(text, ' ')) as term from f),
c as (select source, term, count(*)::bigint as n
      from tok where term <> '' group by 1, 2),
p as (
  select term,
         coalesce(sum(case when source = '{KS_SRC_A}' then n end), 0)
           ::bigint as x1,
         coalesce(sum(case when source = '{KS_SRC_B}' then n end), 0)
           ::bigint as x2
  from c group by term),
tot as (
  select sum(x1)::double as n1, sum(x2)::double as n2,
         {a} * count(*)::double as a0
  from p),
z as (
  select p.term, p.x1, p.x2,
         round((ln((p.x1 + {a}) / (t.n1 + t.a0 - p.x1 - {a}))
                - ln((p.x2 + {a}) / (t.n2 + t.a0 - p.x2 - {a})))
               / sqrt(1.0 / (p.x1 + {a}) + 1.0 / (p.x2 + {a})), 6) as z
  from p, tot t),
r as (select *, row_number() over (order by abs(z) desc, term) as rn
      from z)
select term, x1 as n_a, x2 as n_b, z from r where rn <= {LOGODDS_TOP_K}
"""



PARETO_TOP_PCT = 20  # "what share of volume do the top X% keys carry"


def q_pareto_concentration(sf_dir: str):
    """Pareto concentration of the event volume over users — the
    80/20 diagnostic ("what share of events do the top 20% of users
    generate?") that decides whether per-user salting is needed before
    any user-keyed shuffle. Exact and rank-free: per-user counts (one
    combiner groupby), then the count-of-counts histogram (distinct
    per-user volumes — a tiny domain) is cumulated on the driver from
    the heaviest volume down; integer cross-multiplication picks the
    top-ceil(U*pct/100) users and sums their events, so no user-level
    sort ever happens. Output is one row: users, events, events held
    by the top cohort, and the share in ppm."""
    ds = _read(sf_dir, "events", ["user_id"])

    def per_user(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n"])

    counts = (
        ds.map_batches(per_user, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.select(["n"]).group_by("n").aggregate([([], "count_all")])
        return g.rename_columns(["n", "n_users"])

    rows = (
        counts.map_batches(hist, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("n")
        .aggregate(ray.data.aggregate.Sum("n_users", alias_name="n_users"))
        .take_all()
    )  # O(distinct per-user volumes)
    rows.sort(key=lambda r: -r["n"])
    users = sum(r["n_users"] for r in rows)
    events = sum(r["n"] * r["n_users"] for r in rows)
    k = -(-users * PARETO_TOP_PCT // 100)  # ceil
    taken = top_events = 0
    for r in rows:
        take = min(r["n_users"], k - taken)
        top_events += take * r["n"]
        taken += take
        if taken >= k:
            break
    return pa.table(
        {
            "n_users": pa.array([users], pa.int64()),
            "n_events": pa.array([events], pa.int64()),
            "top_users": pa.array([k], pa.int64()),
            "top_events": pa.array([top_events], pa.int64()),
            "share_ppm": pa.array(
                [top_events * 1_000_000 // events], pa.int64()
            ),
        }
    )


PARETO_SQL = f"""
with c as (select user_id, count(*)::bigint as n from events group by 1),
tot as (select count(*)::bigint as users, sum(n)::bigint as events from c),
k as (select ((users * {PARETO_TOP_PCT}) + 99) // 100 as k from tot),
r as (select n, row_number() over (order by n desc, user_id) as rn from c)
select t.users as n_users, t.events as n_events,
       (select k from k) as top_users,
       (select sum(n) from r where rn <= (select k from k))::bigint
         as top_events,
       ((select sum(n) from r where rn <= (select k from k)) * 1000000
        // t.events)::bigint as share_ppm
from tot t
"""



QUERIES = {
    "normalize_text": q_normalize,
    "pages_roundtrip": q_pages_roundtrip,
    "rule_extract": q_rule_extract,
    "pareto_concentration": q_pareto_concentration,
    "log_odds_terms": q_log_odds_terms,
    "ks_test": q_ks_test,
    "caps_ratio": q_caps_ratio,
    "gap_exponential_fit": q_gap_exponential_fit,
    "cdc_chunk_stats": q_cdc_chunk_stats,
    "canonical_extract": q_canonical_extract,
    "minhash_calibration": q_minhash_calibration,
    "token_quota": q_token_quota,
    "outline_depth_stats": q_outline_depth_stats,
    "simhash_idf": q_simhash_idf,
    "simhash_hamming_hist": q_simhash_hamming_hist,
    "fisher_dims": q_fisher_dims,
    "event_trigrams": q_event_trigrams,
    "brand_return_rates": q_brand_return_rates,
    "part_supply_risk": q_part_supply_risk,
    "ship_delay_stats": q_ship_delay_stats,
    "centroid_distances": q_centroid_distances,
    "schema_drift": q_schema_drift,
    "seasonal_backtest": q_seasonal_backtest,
    "props_extract": q_props_extract,
    "q5_local_supplier": q_q5_local_supplier,
    "cluster_chaining_audit": q_cluster_chaining_audit,
    "score_reliability": q_score_reliability,
    "df_stopwords": q_df_stopwords,
    "dup_rate_estimate": q_dup_rate_estimate,
    "consistent_hash_assign": q_consistent_hash_assign,
    "span_intervals": q_span_intervals,
    "partitioned_write_roundtrip": q_partitioned_write_roundtrip,
    "match_spans": q_match_spans,
    "merge_upserts": q_merge_upserts,
    "wau_rolling": q_wau_rolling,
    "hll_cumulative": q_hll_cumulative,
    "domain_pagerank": q_domain_pagerank,
    "graph_negative_edges": q_graph_negative_edges,
    "score_calibrate": q_score_calibrate,
    "equidepth_bins": q_equidepth_bins,
    "join_bloom_prefilter": q_join_bloom_prefilter,
    "entity_clusters": q_entity_clusters,
    "html_to_markdown": q_html_to_markdown,
    "t_closeness": q_t_closeness,
    "shard_plan": q_shard_plan,
    "date_extract": q_date_extract,
    "jsonld_extract": q_jsonld_extract,
    "contrastive_pairs": q_contrastive_pairs,
    "heading_outline": q_heading_outline,
    "html_tables": q_html_tables,
    "rank_fusion": q_rank_fusion,
    "join_outer": q_join_outer,
    "freq_itemsets": q_freq_itemsets,
    "approx_quantiles": q_approx_quantiles,
    "entity_resolve": q_entity_resolve,
    "snm_pairs": q_snm_pairs,
    "build_postings": q_build_postings,
    "link_density": q_link_density,
    "snapshot_asof": q_snapshot_asof,
    "crawl_schedule": q_crawl_schedule,
    "quality_composite": q_quality_composite,
    "pii_scan": q_pii_scan,
    "pii_scrub": q_pii_scrub,
    "pii_gate": q_pii_gate,
    "bitext_mine": q_bitext_mine,
    "leakage_free_split": q_leakage_free_split,
    "content_fingerprint": q_fingerprint,
    "token_count": q_token_count,
    "quality_score": q_quality,
    "lang_id": q_lang_id,
    "doc_fingerprint_rolling": q_doc_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_minhash_clusters": q_dedup_minhash_clusters,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_jaccard,
    "dedup_minhash_est": q_dedup_minhash_est,
    "setsim_join": q_setsim_join,
    "syndication_pairs": q_syndication_pairs,
    "embed_project": q_embed_project,
    "embed_quantize": q_embed_quantize,
    "ngram_novelty": q_ngram_novelty,
    "dedup_containment": q_dedup_containment,
    "dedup_keep_best": q_dedup_keep_best,
    "tfidf_top_terms": q_tfidf_top_terms,
    "inverted_index": q_inverted_index,
    "embedding_neardup": q_embedding_neardup,
    "knn_brute": q_knn_brute,
    "knn_ivf": q_knn_ivf,
    "knn_lsh": q_knn_lsh,
    "dedup_semantic": q_dedup_semantic,
    "agg_lineitem": q_agg_lineitem,
    "join_revenue": q_join_revenue,
    "join_large": q_join_large,
    "join_bucketed": q_join_bucketed,
    "multihop_join": q_multihop_join,
    "topk_orders": q_topk_orders,
    "distinct_events": q_distinct_events,
    "approx_distinct_kmv": q_approx_distinct,
    "skew_f2": q_skew_f2,
    "heavy_hitters": q_heavy_hitters,
    "cdc_dedup": q_cdc_dedup,
    "asof_join": q_asof_join,
    "asof_join_bucketed": q_asof_join_bucketed,
    "window_hourly": q_window_hourly,
    "window_sliding": q_sliding_window,
    "event_lag": q_event_lag,
    "event_lag_bucketed": q_event_lag_bucketed,
    "sessionize": q_sessionize,
    "sessionize_bucketed": q_sessionize_bucketed,
    "media_meta": q_media_meta,
    "curate_documents": q_curate,
    "curate_neardup": q_curate_neardup,
    "vocab_top_terms": q_top_terms,
    "sample_systematic": q_sample_systematic,
    "sample_stratified": q_sample_stratified,
    "media_frames": q_media_frames,
    "extract_synthetic": q_extract_synthetic,
    "extract_grid_cards": q_extract_grid_cards,
    "decontaminate": q_decontaminate,
    "quality_gopher": q_word_stats,
    "repetition_signals": q_repetition_signals,
    "domain_quota": q_domain_quota,
    "outlinks": q_outlinks,
    "link_indegree": q_link_indegree,
    "pagerank": q_pagerank,
    "reciprocal_links": q_reciprocal_links,
    "char_entropy": q_char_entropy,
    "anchor_text": q_anchor_text,
    "html_meta": q_html_meta,
    "snapshot_latest": q_snapshot_latest,
    "snapshot_diff": q_snapshot_diff,
    "snapshot_incremental": q_snapshot_incremental,
    "domain_reputation": q_domain_reputation,
    "url_filter": q_url_filter,
    "lang_id_multi": q_lang_id_multi,
    "decontaminate_semantic": q_decontaminate_semantic,
    "media_phash_pairs": q_media_phash_pairs,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "robots_filter": q_robots_filter,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "external_link_ratio": q_external_link_ratio,
    "length_quantiles": q_length_quantiles,
    "global_rank": q_global_rank,
    "label_centroids": q_label_centroids,
    "pii_redact": q_pii_redact,
    "line_dedup": q_line_dedup,
    "line_dedup_domain": q_line_dedup_domain,
    "clean_c4": q_clean_c4,
    "lm_score": q_lm_score,
    "lm_bigram": q_lm_bigram,
    "url_dedup": q_url_dedup,
    "chunk_windows": q_chunk_windows,
    "pack_sequences": q_pack_sequences,
    "bigram_topk": q_bigram_topk,
    "quality_tiers": q_quality_tiers,
    "domain_stats": q_domain_stats,
    "decontaminate_ngram": q_decontaminate_ngram,
    "mix_rebalance": q_mix_rebalance,
    "dedup_substring": q_dedup_substring,
    "build_training_set": q_build_training_set,
    "split_assign": q_split_assign,
    "bm25_search": q_bm25_search,
    "embedding_outliers": q_embedding_outliers,
    "dsir_weights": q_dsir_weights,
    "crawl_frontier": q_crawl_frontier,
    "top_terms_by_lang": q_top_terms_by_lang,
    "warc_roundtrip": q_warc_roundtrip,
    "cdx_index": q_cdx_index,
    "warc_fetch": q_warc_fetch,
    "bloom_dedup": q_bloom_dedup,
    "ccnet_buckets": q_ccnet_buckets,
    "bpe_pairs": q_bpe_pairs,
    "bpe_train": q_bpe_train,
    "sample_reservoir": q_sample_reservoir,
    "sample_weighted": q_sample_weighted,
    "sample_weighted_stratified": q_sample_weighted_stratified,
    "domain_dup_stats": q_domain_dup_stats,
    "funnel": q_funnel,
    "range_join": q_range_join,
    "range_join_bucketed": q_range_join_bucketed,
    "approx_distinct_hll": q_approx_distinct_hll,
    "hits_rank": q_hits_rank,
    "cohort_retention": q_cohort_retention,
    "session_stats": q_session_stats,
    "link_components": q_link_components,
    "mirror_domains": q_mirror_domains,
    "xlang_mine": q_xlang_mine,
    "topic_tag": q_topic_tag,
    "dedup_threshold_sweep": q_dedup_threshold_sweep,
    "graph_triangles": q_graph_triangles,
    "link_kcore": q_link_kcore,
    "link_distance": q_link_distance,
    "knn_graph": q_knn_graph,
    "kcenter_sample": q_kcenter_sample,
    "user_rfm": q_user_rfm,
    "lexical_diversity": q_lexical_diversity,
    "hapax_rate": q_hapax_rate,
    "scd2_intervals": q_scd2_intervals,
    "late_events": q_late_events,
    "collocations": q_collocations,
    "posting_gaps": q_posting_gaps,
    "quantiles_by_domain": q_quantiles_by_domain,
    "url_history": q_url_history,
    "url_templates": q_url_templates,
    "degree_distribution": q_degree_distribution,
    "top_docs_per_source": q_top_docs_per_source,
    "dedup_eval_lsh": q_dedup_eval_lsh,
    "dedup_eval_exact": q_dedup_eval_exact,
    "phrase_search": q_phrase_search,
    "pivot_events": q_pivot_events,
    "decayed_counts": q_decayed_counts,
    "rollup_source_lang": q_rollup_source_lang,
    "running_total": q_running_total,
    "key_skew": q_key_skew,
    "orders_without_lineitems": q_orders_without_lineitems,
    "global_quantiles": q_global_quantiles,
    "winsorize_lengths": q_winsorize,
    "hash_features": q_hash_features,
    "dau": q_dau,
    "cocitation": q_cocitation,
    "vocab_coverage": q_vocab_coverage,
    "mojibake": q_mojibake,
    "tokenizer_fertility": q_tokenizer_fertility,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "kmeans": q_kmeans,
    "cluster_sample": q_cluster_sample,
    "quality_logit": q_quality_logit,
    "filter_agreement": q_filter_agreement,
    "split_token_budget": q_split_token_budget,
    "redirects": q_redirects,
    "join_skewed": q_join_skewed,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_simhash_clusters": q_dedup_simhash_clusters,
    "dedup_cross_corpus": q_dedup_cross_corpus,
    "readability": q_readability,
    "script_mix": q_script_mix,
    "dom_templates": q_dom_templates,
    "bpe_encode": q_bpe_encode,
    "dedup_prefix": q_dedup_prefix,
    "trustrank": q_trustrank,
    "ann_recall": q_ann_recall,
    "event_transitions": q_event_transitions,
    "embed_standardize": q_embed_standardize,
    "embed_covariance": q_embed_covariance,
    "copy_search": q_copy_search,
    "signal_correlation": q_signal_correlation,
    "embed_pca": q_embed_pca,
    "join_storage_bucketed": q_join_storage_bucketed,
    "agg_incremental": q_agg_incremental,
    "domain_entropy": q_domain_entropy,
    "snapshot_editdist": q_snapshot_editdist,
    "domain_similarity": q_domain_similarity,
    "zipf_slope": q_zipf_slope,
    "first_seen": q_first_seen,
    "corpus_kl": q_corpus_kl,
    "session_paths": q_session_paths,
    "event_anomaly": q_event_anomaly,
    "audience_overlap": q_audience_overlap,
    "profile_table": q_profile_table,
    "k_anonymity": q_k_anonymity,
    "dedup_editdist": q_dedup_editdist,
    "dedup_phash_clusters": q_dedup_phash_clusters,
    "monthly_growth": q_monthly_growth,
    "lang_confusion": q_lang_confusion,
    "dedup_funnel": q_dedup_funnel,
    "embed_matryoshka": q_embed_matryoshka,
    "event_stationary": q_event_stationary,
    "event_entropy": q_event_entropy,
    "user_survival_curve": q_user_survival,
    "event_cusum": q_event_cusum,
    "embed_pq": q_embed_pq,
    "temporal_novelty": q_temporal_novelty,
    "coverage_sample": q_coverage_sample,
    "l_diversity": q_l_diversity,
    "markov_perplexity": q_markov_perplexity,
    "csv_roundtrip": q_csv_roundtrip,
    "event_gaps_hist": q_event_gaps_hist,
    "domain_gini": q_domain_gini,
    "ab_lift": q_ab_lift,
    "weekday_seasonality": q_weekday_seasonality,
    "graph_assortativity": q_graph_assortativity,
    "attribution_delay": q_attribution_delay,
    "label_prop": q_label_prop,
    "rowgroup_prune": q_rowgroup_prune,
    "event_burstiness": q_event_burstiness,
    "crawl_budget": q_crawl_budget,
    "length_lognormal": q_length_lognormal,
    "user_features": q_user_features,
}


def _norm_expr() -> str:
    return normalize_sql("text")


def _stop_count_sql() -> str:
    return " + ".join(
        f"length(regexp_extract_all(text, '\\b{w}\\b'))" for w in tx.STOPWORDS
    )


ORACLES: dict[str, str] = {
    "normalize_text": (
        f"select doc_id, {_norm_expr()} as text_norm from documents"
    ),
    "pages_roundtrip": (
        "select doc_id, "
        "case doc_id % 3 when 0 then 'text' when 1 then 'html' else 'pdf' end as kind, "
        f"{_norm_expr()} as text_norm from documents"
    ),
    "rule_extract": (
        "select event_id, regexp_extract(props, '\"k\":\\s*(\\d+)', 1) as k_value "
        "from events"
    ),
    "content_fingerprint": (
        "select doc_id, md5(coalesce(array_to_string(list_sort(list_distinct("
        "list_filter(string_split(text, ' '), x -> x in "
        "('spark','join','merge','window','stream','vector')))), '|'), '')) as fp "
        "from documents"
    ),
    "token_count": (
        "select doc_id, length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens "
        "from documents"
    ),
    "quality_score": (
        "select doc_id, length(text)::bigint as n_chars, "
        "length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens, "
        f"round(({_stop_count_sql()}) * 1.0 / "
        "greatest(length(regexp_extract_all(text, '\\S+')), 1), 6) as stop_ratio, "
        "round(length(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / "
        "greatest(length(text), 1), 6) as punct_ratio, "
        "round(length(text) * 1.0 / "
        "greatest(length(regexp_extract_all(text, '\\S+')), 1), 6) as mean_tok_len "
        "from documents"
    ),
    "lang_id": (
        f"select doc_id, case when ({_stop_count_sql()}) * 1.0 / "
        "greatest(length(regexp_extract_all(text, '\\S+')), 1) > 0.05 "
        "then 'en' else 'und' end as predicted_lang from documents"
    ),
    "dedup_exact": (
        "select md5(text) as content_md5, min(doc_id) as keep_doc_id, "
        "count(*) as n_copies from documents group by md5(text)"
    ),
    "embedding_neardup": (
        "select e1.vec_id as a, e2.vec_id as b "
        "from embeddings e1 join embeddings e2 "
        "on e1.label = e2.label and e1.vec_id < e2.vec_id "
        "where round(list_cosine_similarity(e1.embedding::double[], "
        "e2.embedding::double[]), 4) >= 0.35"
    ),

    "curate_documents": (
        """
        with feat as (
          select doc_id, text,
                 length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens,
                 (length(regexp_extract_all(text, '\\bthe\\b')) + length(regexp_extract_all(text, '\\ba\\b')) + length(regexp_extract_all(text, '\\bof\\b')) + length(regexp_extract_all(text, '\\band\\b')) + length(regexp_extract_all(text, '\\bto\\b')) + length(regexp_extract_all(text, '\\bin\\b')) + length(regexp_extract_all(text, '\\bis\\b')) + length(regexp_extract_all(text, '\\bit\\b'))) * 1.0 /
                   greatest(length(regexp_extract_all(text, '\\S+')), 1)
                   as stop_ratio_raw
          from documents),
        gated as (
          select doc_id, text, n_tokens from feat
          where n_tokens >= 20 and stop_ratio_raw > 0.05)
        select min(doc_id) as doc_id, min(n_tokens) as n_tokens
        from gated group by md5(text)
        """
    ),

    # fake decode = md5-derived metadata (stages/media.py:_fake_meta);
    # format keys off the first PAYLOAD BYTE (via to_hex(encode())), not
    # the first character, so non-ASCII text stays byte-exact
    "media_meta": (
        """
        select doc_id,
               64 + ('0x' || substr(md5(text), 1, 8))::uinteger % 1856
                 as width,
               64 + ('0x' || substr(md5(text), 9, 8))::uinteger % 1016
                 as height,
               case when octet_length(encode(text)) = 0 then 'jpeg'
                    else ['jpeg', 'png', 'webp']
                         [1 + ('0x' || substr(to_hex(encode(text)), 1, 2))::int % 3]
               end as format,
               octet_length(encode(text)) as n_bytes
        from documents
        """
    ),
    "sample_stratified": (
        """
        select doc_id, lang from documents
        where ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger
              % 1000
              < case when lang = 'en' then 200 else 600 end
        """
    ),
    "media_frames": (
        """
        with meta as (
          select doc_id, n_chars / 100.0 + 1.0 as duration_s, 30.0 as fps
          from documents),
        plan as (
          select doc_id, fps,
                 unnest(range(0, cast(floor(duration_s * fps) as bigint), 30))
                   as frame_idx
          from meta)
        select doc_id, frame_idx,
               cast(floor(frame_idx * 1000 / fps) as bigint) as ts_ms
        from plan
        """
    ),
    "vocab_top_terms": (
        """
        with t as (select unnest(string_split(text, ' ')) as term
                   from documents),
        c as (select term, count(*)::bigint as n from t
              where term <> '' group by term)
        select term, n from c order by n desc, term asc limit 50
        """
    ),
    "sample_systematic": (
        "select doc_id, n_chars from documents where doc_id % 8 = 0"
    ),
    "knn_brute": (
        # sims are ranked at 4 dp with vec_id tie-break on BOTH sides so
        # float32-vs-float64 cosine noise (~1e-8) cannot flip the result;
        # the similarity value itself is excluded from the hashed output.
        f"""
        with q as (select vec_id as qid, embedding as qe from embeddings
                   order by vec_id limit {N_QUERIES}),
        scored as (select q.qid, e.vec_id as nid,
                          round(list_cosine_similarity(q.qe::double[],
                                e.embedding::double[]), 4) as sim
                   from q cross join embeddings e),
        ranked as (select *, row_number() over
                     (partition by qid order by sim desc, nid asc) as rn
                   from scored)
        select qid as query_id, nid as neighbor_id
        from ranked where rn <= {KNN_K}
        """
    ),
    "knn_graph": KNNG_ORACLE_SQL,
    "kcenter_sample": kcenter_oracle_sql(),
    "user_rfm": user_rfm_oracle_sql(),
    "lexical_diversity": """
with t as (select doc_id, regexp_extract_all(text, '\\S+') as toks
           from documents)
select doc_id, length(toks)::bigint as n_tokens,
       length(list_distinct(toks))::bigint as n_types,
       (length(list_distinct(toks)) * 1000000 // length(toks))::bigint
         as ttr_ppm
from t where length(toks) > 0
""",
    "hapax_rate": """
with w as (select source, unnest(regexp_extract_all(text, '\\S+')) as word
           from documents),
tf as (select source, word, count(*) as n from w group by source, word)
select source, count(*)::bigint as n_vocab,
       sum((n = 1)::int)::bigint as n_hapax,
       (sum((n = 1)::int) * 1000000 // count(*))::bigint as hapax_ppm
from tf group by source
""",
    "late_events": """
with w as (select user_id, ts,
                  max(ts) over (partition by user_id order by event_id
                    rows between unbounded preceding and 1 preceding)
                    as wm
           from events)
select user_id, count(*)::bigint as n_events,
       coalesce(sum((ts < wm)::int), 0)::bigint as n_late,
       coalesce(max(case when ts < wm
                         then epoch_us(wm) - epoch_us(ts) end),
                0)::bigint as max_lateness_us
from w group by user_id
""",
    "agg_lineitem": (
        "select l_returnflag, l_linestatus, round(sum(l_quantity), 2) as sum_qty, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_revenue, "
        "round(avg(l_discount), 6) as avg_disc, count(*) as n "
        "from lineitem where l_shipdate < timestamp '1995-09-02' "
        "group by l_returnflag, l_linestatus"
    ),
    "join_revenue": (
        "select c_mktsegment, round(sum(o_totalprice), 2) as revenue, "
        "count(*) as n_orders from orders join customer on o_custkey = c_custkey "
        "group by c_mktsegment"
    ),

    "join_large": (
        "select o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue, "
        "count(*) as n_lineitems from orders join lineitem "
        "on o_orderkey = l_orderkey group by o_orderpriority"
    ),
    "join_bucketed": (
        "select o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue, "
        "count(*) as n_lineitems from orders join lineitem "
        "on o_orderkey = l_orderkey group by o_orderpriority"
    ),
    "multihop_join": (
        "select r_name, count(*) as n_customers, "
        "round(sum(c_acctbal), 2) as total_acctbal "
        "from customer join nation on c_nationkey = n_nationkey "
        "join region on n_regionkey = r_regionkey group by r_name"
    ),
    "topk_orders": (
        "select o_orderkey, o_totalprice from orders "
        "order by o_totalprice desc, o_orderkey asc limit 10"
    ),
    "distinct_events": "select distinct event_type from events",
    "winsorize_lengths": """
with s as (select n_chars as v,
                  row_number() over (order by n_chars) - 1 as r
           from documents),
nn as (select count(*) as n from documents),
lo as (select v from s, nn where r = ((nn.n - 1) * 1) // 100),
hi as (select v from s, nn where r = ((nn.n - 1) * 99) // 100)
select d.doc_id, d.n_chars,
       least(greatest(d.n_chars, lo.v), hi.v) as clipped,
       (d.n_chars < lo.v or d.n_chars > hi.v) as was_clipped
from documents d, lo, hi
""",
    # exact integer step-decay replay: same epoch-us arithmetic, same
    # >> k right-shift weight, same 30-step clamp
    "decayed_counts": f"""
with m as (select max(epoch_us(ts)) as ref from events)
select event_type,
       sum(1000000 // (2 ** least((m.ref - epoch_us(ts))
                                  // {DECAY_HALFLIFE_US}, 30))::bigint)::bigint
         as decayed_micro,
       count(*)::bigint as n_events
from events, m
group by event_type
""",
    # replays the KMV bottom-k sketch exactly (stages/sketch.py): same
    # 60-bit md5-prefix hash, same k, same estimator arithmetic — an
    # approximate operator with an exact, value-verifying oracle
    "approx_distinct_kmv": """
with h as (
  select distinct
    ('0x' || substr(md5(cast(event_id as varchar)), 1, 15))::ubigint::bigint
      as hv
  from events where event_id is not null),
k as (select hv from h order by hv limit 256)
select count(*)::bigint as k, max(hv) as kth_h,
       round((count(*) - 1) * pow(2.0, 60) / max(hv), 6) as est_distinct
from k
""",
    "sample_reservoir": (
        f"select doc_id, md5(cast(doc_id as varchar)) as rk "
        f"from documents order by rk limit {RESERVOIR_K}"
    ),
    # replays the DLT priority-sampling arithmetic exactly: same 60-bit
    # md5-prefix hash, same integer (hv+1) before the double conversion
    # (converting then adding 1.0 can differ by an ulp at 2^60), same
    # single IEEE division and max-threshold estimator
    "sample_weighted": f"""
with pri as (
  select doc_id, n_chars,
         n_chars::double /
         ((('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::ubigint
           + 1)::double) as p
  from documents),
top as (select * from pri order by p desc, doc_id limit {SAMPLE_W_K + 1}),
tau as (select case when (select count(*) from top) > {SAMPLE_W_K}
                    then (select min(p) from top) else 0.0 end as t)
select doc_id, n_chars, round(p, 6) as pri,
       round(greatest(n_chars::double, (select t from tau)), 6) as est_w
from top
order by p desc, doc_id
limit {SAMPLE_W_K}
""",
    # per-stratum DLT replay: row_number within source, tau = the
    # (k+1)-th priority of the stratum (0 when the stratum is smaller)
    "sample_weighted_stratified": f"""
with pri as (
  select source, doc_id, n_chars,
         n_chars::double /
         ((('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::ubigint
           + 1)::double) as p
  from documents),
r as (select *, row_number() over (partition by source
                                   order by p desc, doc_id) as rn from pri),
tau as (select source,
               max(case when rn = {SAMPLE_WS_K + 1} then p else 0 end) as t
        from r group by source)
select r.source, doc_id, n_chars, round(p, 6) as pri,
       round(greatest(n_chars::double, tau.t), 6) as est_w
from r join tau using (source)
where rn <= {SAMPLE_WS_K}
""",
    "domain_dup_stats": """
with g as (
  select source, md5(coalesce(text, '')) as h, count(*)::bigint as c
  from documents group by 1, 2)
select source, sum(c)::bigint as n_docs, count(*)::bigint as n_unique,
       round(1.0 - count(*) * 1.0 / sum(c), 6) as dup_ratio
from g group by source
""",
    "funnel": """
with v as (select user_id, min(ts) as t_view
           from events where event_type = 'view' group by 1),
c as (select e.user_id, min(e.ts) as t_click
      from events e join v using (user_id)
      where e.event_type = 'click' and e.ts > v.t_view group by 1),
p as (select e.user_id, min(e.ts) as t_purchase
      from events e join c using (user_id)
      where e.event_type = 'purchase' and e.ts > c.t_click group by 1)
select u.user_id, v.t_view, c.t_click, p.t_purchase,
       (case when p.t_purchase is not null then 1 else 0 end)::bigint
         as completed
from (select distinct user_id from events) u
left join v using (user_id)
left join c using (user_id)
left join p using (user_id)
""",
    "range_join": f"""
select e.event_id, count(v.ts)::bigint as n_views_5m
from events e left join events v
  on v.user_id = e.user_id and v.event_type = 'view'
 and v.ts >= e.ts - interval {RANGE_WINDOW_S} second and v.ts < e.ts
group by e.event_id
""",
    # the bucketed decomposition is value-identical by construction;
    # same oracle as the plain operator
    "range_join_bucketed": f"""
select e.event_id, count(v.ts)::bigint as n_views_5m
from events e left join events v
  on v.user_id = e.user_id and v.event_type = 'view'
 and v.ts >= e.ts - interval {RANGE_WINDOW_S} second and v.ts < e.ts
group by e.event_id
""",
    "cohort_retention": """
with ud as (
  select distinct user_id, date_trunc('day', ts) as day from events),
c as (select user_id, min(day) as cohort_day from ud group by user_id)
select c.cohort_day,
       date_diff('day', c.cohort_day, ud.day)::bigint as day_offset,
       count(*)::bigint as n_users
from ud join c using (user_id)
group by 1, 2
""",
    "session_stats": f"""
with o as (
  select user_id, ts, event_id, event_type, value,
         case when lag(ts) over w is null
                or ts - lag(ts) over w > interval {SESSION_GAP_S} seconds
              then 1 else 0 end as new_s
  from events
  window w as (partition by user_id order by ts, event_id)),
s as (
  select *, sum(new_s) over (partition by user_id order by ts, event_id
                             rows unbounded preceding) as session_idx
  from o)
select user_id, session_idx::bigint as session_idx,
       count(*)::bigint as n_events,
       date_diff('microsecond', min(ts), max(ts))::bigint as duration_us,
       sum(case when event_type = 'purchase' then 1 else 0 end)::bigint
         as n_purchases,
       sum(floor(value * 1000000 + 0.5)::bigint)::bigint as revenue_micro
from s group by user_id, session_idx
""",
    "collocations": f"""
with tk as (select {dd.SQL_TOKENIZE.format(col="text")} as toks
            from documents),
big as (
  select split_part(p, ' ', 1) as w1, split_part(p, ' ', 2) as w2
  from (select unnest(case when len(toks) >= 2 then
                 list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i+1])
               else [] end) as p
        from tk)),
uni as (select unnest(toks) as w from tk),
cb as (select w1, w2, count(*)::bigint as c_ab from big group by 1, 2),
cu as (select w, count(*)::bigint as c from uni group by w),
tot as (select (select count(*)::bigint from uni) as n_tok,
               (select count(*)::bigint from big) as n_pairs)
select cb.w1, cb.w2, cb.c_ab, ca.c as c_a, cbb.c as c_b,
       round((cb.c_ab::double * tot.n_tok * tot.n_tok)
             / ((tot.n_pairs::double * ca.c) * cbb.c), 6) as lift
from cb
cross join tot
join cu ca on ca.w = cb.w1
join cu cbb on cbb.w = cb.w2
where cb.c_ab >= {COLLOC_MIN_COUNT}
""",
    "posting_gaps": """
with p as (
  select distinct doc_id, term
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '')
select term,
       row_number() over (partition by term order by doc_id)::bigint
         as idx,
       doc_id,
       (doc_id - coalesce(
          lag(doc_id) over (partition by term order by doc_id),
          0))::bigint as gap
from p
""",
    "quantiles_by_domain": """
with r as (select source, n_chars,
                  row_number() over (partition by source
                                     order by n_chars) as rn,
                  count(*) over (partition by source) as n
           from documents)
select source, max(n)::bigint as n_docs,
       max(case when rn = (n - 1) // 2 + 1 then n_chars end)::bigint
         as p50_chars,
       max(case when rn = ((n - 1) * 9) // 10 + 1 then n_chars end)::bigint
         as p90_chars
from r group by source
""",
    "top_docs_per_source": f"""
select source, doc_id, n_chars, rank from (
  select source, doc_id, n_chars,
         row_number() over (partition by source
                            order by n_chars desc, doc_id asc)::bigint
           as rank
  from documents)
where rank <= {TOP_DOCS_PER_SOURCE}
""",
    "pivot_events": """
select user_id,
       sum(case when event_type = 'view' then 1 else 0 end)::bigint
         as n_view,
       sum(case when event_type = 'click' then 1 else 0 end)::bigint
         as n_click,
       sum(case when event_type = 'purchase' then 1 else 0 end)::bigint
         as n_purchase,
       sum(floor(value * 1000000 + 0.5)::bigint)::bigint as value_micro
from events group by user_id
""",
    "rollup_source_lang": """
select source, lang, count(*)::bigint as n_docs,
       sum(n_chars)::bigint as sum_chars
from documents
group by rollup(source, lang)
""",
    "running_total": """
select event_id, user_id,
       row_number() over w::bigint as seq,
       sum(floor(value * 1000000 + 0.5)::bigint) over w::bigint
         as cum_value_micro
from events
window w as (partition by user_id order by ts, event_id
             rows unbounded preceding)
""",
    "key_skew": """
with c as (select user_id, count(*)::bigint as n from events
           group by user_id),
t as (select user_id, n from c order by n desc, user_id asc limit 1),
tot as (select sum(n)::bigint as n_rows, count(*)::bigint as n_keys
        from c)
select tot.n_rows, tot.n_keys, t.user_id as top_key, t.n as top_n,
       (t.n * 1000000 // tot.n_rows)::bigint as top_share_ppm
from tot, t
""",
    "orders_without_lineitems": """
select o_orderkey, o_custkey, o_totalprice from orders o
where not exists (select 1 from lineitem l
                  where l.l_orderkey = o.o_orderkey)
""",
    "global_quantiles": """
with r as (select n_chars,
                  row_number() over (order by n_chars) as rn,
                  count(*) over () as n
           from documents)
select max(n)::bigint as n_docs,
       max(case when rn = (n - 1) // 2 + 1 then n_chars end)::bigint
         as p50_chars,
       max(case when rn = ((n - 1) * 9) // 10 + 1 then n_chars end)::bigint
         as p90_chars,
       max(case when rn = ((n - 1) * 99) // 100 + 1 then n_chars
           end)::bigint as p99_chars
from r
""",
    "hash_features": f"""
with tri as (
  select doc_id, substr(text, i, 3) as g
  from documents, unnest(range(1, length(text) - 1)) as r(i))
select doc_id,
       (('0x' || substr(md5(g), 1, 8))::uinteger
        % {HASH_FEATURE_BUCKETS})::bigint as bucket,
       count(*)::bigint as n
from tri group by 1, 2
""",
    "quality_logit": f"""
with tri as (
  select doc_id, substr(text, i, 3) as g
  from documents, unnest(range(1, length(text) - 1)) as r(i)),
feats as (
  select doc_id,
         (('0x' || substr(md5(g), 1, 8))::uinteger
          % {HASH_FEATURE_BUCKETS})::bigint as bucket,
         count(*)::bigint as n
  from tri group by 1, 2),
w as (
  select b::bigint as bucket,
         ((('0x' || substr(md5(b::varchar), 1, 8))::uinteger
           % {LOGIT_WEIGHT_SPAN})::bigint - 500000) as w
  from unnest(range(0, {HASH_FEATURE_BUCKETS})) t(b)),
s as (
  select f.doc_id, (sum(f.n * w.w) // greatest(sum(f.n), 1))::bigint
           as logit_ppm
  from feats f join w using (bucket) group by f.doc_id)
select d.doc_id, coalesce(s.logit_ppm, 0)::bigint as logit_ppm,
       (case when coalesce(s.logit_ppm, 0) > 0 then 1 else 0 end)::bigint
         as keep
from documents d left join s using (doc_id)
""",
    "dau": """
with ud as (
  select distinct user_id, date_trunc('day', ts) as day from events),
f as (select user_id, min(day) as first_day from ud group by user_id)
select ud.day, count(*)::bigint as n_active,
       sum(case when ud.day = f.first_day then 1 else 0 end)::bigint
         as n_new
from ud join f using (user_id)
group by ud.day
""",
    "vocab_coverage": f"""
with t as (select unnest(string_split(text, ' ')) as term
           from documents),
c as (select term, count(*)::bigint as n from t
      where term <> '' group by term),
top as (select term, n from c order by n desc, term asc
        limit {VOCAB_TOP_K}),
tot as (select sum(n)::bigint as n_tokens from c),
iv as (select sum(n)::bigint as n_in,
              count(*)::bigint as vocab_size from top)
select tot.n_tokens, iv.n_in as n_in_vocab, iv.vocab_size,
       (iv.n_in * 1000000 // tot.n_tokens)::bigint as coverage_ppm
from tot, iv
""",
    "asof_join": (
        # not DuckDB's ASOF JOIN: with duplicate click timestamps ASOF
        # picks an arbitrary row among equal c_ts — this window form pins
        # the tie-break (max c_ts, then max c_id) to match the engine's
        # (ts, event_id)-sorted searchsorted exactly, data-independent
        """
        with clicks as (select user_id, ts as c_ts, event_id as c_id
                        from events where event_type = 'click'),
        best as (
          select event_id, c_id, c_ts from (
            select e.event_id, c.c_id, c.c_ts,
                   row_number() over (
                     partition by e.event_id
                     order by c.c_ts desc, c.c_id desc) as rn
            from events e join clicks c
              on e.user_id = c.user_id and e.ts > c.c_ts)
          where rn = 1)
        select e.event_id, b.c_id as prior_click_id,
               round(epoch(e.ts - b.c_ts), 6) as gap_s
        from events e left join best b using (event_id)
        """
    ),
    "window_hourly": (
        "select event_type, date_trunc('hour', ts) as hour, count(*) as n, "
        "round(sum(value), 2) as sum_value from events group by 1, 2"
    ),

    "window_sliding": (
        """
        with hourly as (
          select event_type, date_trunc('hour', ts) as hour,
                 count(*)::bigint as n, sum(value) as sv
          from events group by 1, 2),
        spans as (
          select event_type, min(hour) as h0, max(hour) as h1
          from hourly group by 1),
        grid as (
          select s.event_type, gs.h as window_start
          from spans s, lateral (
            select unnest(generate_series(s.h0, s.h1,
                                          interval 1 hour)) as h) gs),
        joined as (
          select g.event_type, g.window_start,
                 coalesce(h1.n, 0) + coalesce(h2.n, 0) as n,
                 round(coalesce(h1.sv, 0) + coalesce(h2.sv, 0), 2) as sum_value
          from grid g
          left join hourly h1 on h1.event_type = g.event_type
                             and h1.hour = g.window_start
          left join hourly h2 on h2.event_type = g.event_type
                             and h2.hour = g.window_start + interval 1 hour)
        select * from joined
        """
    ),
    "event_lag": (
        """
        select event_id, gap_us from (
          select event_id,
                 epoch_us(ts - lag(ts) over
                       (partition by user_id order by ts, event_id)) as gap_us
          from events) where gap_us is not null
        """
    ),
    "sessionize": (
        f"""
        with ordered as (
          select user_id, ts,
                 case when ts - lag(ts) over (partition by user_id order by ts)
                           > interval {SESSION_GAP_S} seconds
                      or lag(ts) over (partition by user_id order by ts) is null
                      then 1 else 0 end as new_session
          from events)
        select user_id, count(*)::bigint as n_events,
               sum(new_session)::bigint as n_sessions
        from ordered group by user_id
        """
    ),
}


# -- SQL re-implementations of the minhash / simhash family ----------------
# (appended to ORACLES: the whole LSH computation is md5 + mod-2^64
# arithmetic, so DuckDB reproduces it value-for-value)

def _minhash_cte_body(source: str = "documents") -> str:
    """The minhash/LSH CTE chain WITHOUT the leading `with`, over an
    arbitrary (doc_id, text) relation — composable after other CTEs."""
    perms = ", ".join(
        f"({i}, {a}::hugeint, {b}::hugeint)"
        for i, (a, b) in enumerate(zip(dd.PERM_A, dd.PERM_B))
    )
    rows_per_band = dd.NUM_PERM // dd.LSH_BANDS
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
toks as (
  select doc_id, {tokenize} as toks from {source}),
sh as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
shu as (select doc_id, unnest(shingles) as s from sh),
hv as (select doc_id,
              ('0x' || substr(md5(s), 1, 16))::ubigint as h from shu),
perms(p_idx, a, b) as (values {perms}),
pv as (
  select doc_id, p_idx,
         min(((a * h::hugeint + b) % 18446744073709551616::hugeint)::ubigint)
           as mh
  from hv cross join perms group by doc_id, p_idx),
sig as (select doc_id, list(mh order by p_idx) as sig from pv group by doc_id),
bandix(band_id) as (select unnest(range({dd.LSH_BANDS}))),
bands as (
  select doc_id, band_id,
         md5(array_to_string(
           list_slice(sig, band_id * {rows_per_band} + 1,
                      band_id * {rows_per_band} + {rows_per_band}), '|'))
           as band_hash
  from sig cross join bandix),
pairs as (
  select distinct x.doc_id as a, y.doc_id as b
  from bands x join bands y
    on x.band_id = y.band_id and x.band_hash = y.band_hash
   and x.doc_id < y.doc_id)
"""


def _minhash_cte() -> str:
    return "with " + _minhash_cte_body()


ORACLES["sessionize_bucketed"] = ORACLES["sessionize"]
ORACLES["asof_join_bucketed"] = ORACLES["asof_join"]
ORACLES["event_lag_bucketed"] = ORACLES["event_lag"]

ORACLES["dedup_minhash_lsh"] = _minhash_cte() + "select a, b from pairs"
ORACLES["dedup_eval_lsh"] = dedup_eval_oracle_sql()

ORACLES["curate_neardup"] = """
with feat as (
  select doc_id, text,
         length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens,
         (length(regexp_extract_all(text, '\\bthe\\b')) + length(regexp_extract_all(text, '\\ba\\b')) + length(regexp_extract_all(text, '\\bof\\b')) + length(regexp_extract_all(text, '\\band\\b')) + length(regexp_extract_all(text, '\\bto\\b')) + length(regexp_extract_all(text, '\\bin\\b')) + length(regexp_extract_all(text, '\\bis\\b')) + length(regexp_extract_all(text, '\\bit\\b'))) * 1.0 /
           greatest(length(regexp_extract_all(text, '\\S+')), 1)
           as stop_ratio_raw
  from documents),
gated as (
  select doc_id, text, n_tokens from feat
  where n_tokens >= 20 and stop_ratio_raw > 0.05),
surv as (
  select min(doc_id) as doc_id, min(n_tokens) as n_tokens
  from gated group by md5(text)),
survtext as (
  select s.doc_id, s.n_tokens, d.text
  from surv s join documents d using (doc_id)),
""" + _minhash_cte_body("survtext") + """,
sd as (select doc_id, list_distinct(shingles) as sd from sh),
verified as (
  select p.a, p.b
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= 0.5),
edges as (select a as src, b as dst from verified
          union select b, a from verified),
comp as (
  select node, rep_id from (
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached
    )
    select node, min(reached) as rep_id from r group by node
  )),
losers as (
  select doc_id from (
    select c.node as doc_id,
           row_number() over (partition by c.rep_id
                              order by s.n_tokens desc, c.node asc) as rn
    from comp c join surv s on s.doc_id = c.node)
  where rn > 1)
select s.doc_id, s.n_tokens from surv s
where s.doc_id not in (select doc_id from losers)
"""


ORACLES["dedup_ngram_jaccard"] = _minhash_cte() + """
, sd as (select doc_id, list_distinct(shingles) as sd from sh)
select p.a, p.b,
       round(len(list_intersect(xa.sd, xb.sd))::double /
             (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
             6) as jaccard
from pairs p
join sd xa on xa.doc_id = p.a
join sd xb on xb.doc_id = p.b
"""

# Exact relational all-pairs Jaccard (pairs sharing >= 1 shingle — for
# tau > 0 that IS every qualifying pair): the oracle does NOT replicate
# the prefix filter, so a green hash check proves the engine's prefix
# pruning has no false negatives on the data (AllPairs lemma, see
# stages/setsim.py). Intersections come from an exploded equijoin +
# group-count — no per-pair list_intersect.
def _setsim_oracle_sql() -> str:
    from ..stages.setsim import SETSIM_TAU

    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with toks as (
  select doc_id, {tokenize} as toks from documents),
shl as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
tok as (select distinct doc_id, unnest(shingles) as s from shl),
sz as (select doc_id, count(*)::bigint as n from tok group by 1),
inter as (
  select a.doc_id as a, b.doc_id as b, count(*)::bigint as c
  from tok a join tok b on a.s = b.s and a.doc_id < b.doc_id
  group by 1, 2)
select i.a, i.b,
       round(c::double / (sa.n + sb.n - c), 6) as jaccard
from inter i
join sz sa on sa.doc_id = i.a
join sz sb on sb.doc_id = i.b
where round(c::double / (sa.n + sb.n - c), 6) >= {SETSIM_TAU}
"""


ORACLES["setsim_join"] = _setsim_oracle_sql()

# same tokenize/shingle CTEs; df over the distinct (doc, shingle) rows
ORACLES["ngram_novelty"] = f"""
with toks as (
  select doc_id, {dd.SQL_TOKENIZE.format(col="text")} as toks
  from documents),
shl as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
tok as (select distinct doc_id, unnest(shingles) as s from shl),
dfc as (select s, count(*)::bigint as df from tok group by 1)
select t.doc_id, count(*)::bigint as n_shingles,
       count(*) filter (dfc.df = 1)::bigint as n_unique,
       round((count(*) filter (dfc.df = 1))::double / count(*), 6)
         as novelty
from tok t join dfc on dfc.s = t.s
group by t.doc_id
"""

ORACLES["syndication_pairs"] = f"""
with pr as ({_setsim_oracle_sql()})
select least(da.source, db.source) as src_a,
       greatest(da.source, db.source) as src_b,
       count(*)::bigint as n_pairs
from pr
join documents da on da.doc_id = pr.a
join documents db on db.doc_id = pr.b
group by 1, 2
"""

ORACLES["dedup_eval_exact"] = f"""
with pred as ({_minhash_cte()} select a, b from pairs),
tr as ({_setsim_oracle_sql()}),
m as (select (select count(*) from pred)::bigint as n_pred,
             (select count(*) from tr)::bigint as n_true,
             (select count(*) from pred join tr using (a, b))::bigint as tp)
select n_pred, n_true, tp,
       (case when n_pred > 0 then tp * 1000000 // n_pred
             else 0 end)::bigint as precision_ppm,
       (case when n_true > 0 then tp * 1000000 // n_true
             else 0 end)::bigint as recall_ppm
from m
"""

ORACLES["phrase_search"] = phrase_search_oracle_sql()

ORACLES["embed_project"] = embed_project_oracle_sql()

ORACLES["embed_quantize"] = EMBED_QUANTIZE_SQL

ORACLES["mirror_domains"] = mirror_domains_oracle_sql()

ORACLES["xlang_mine"] = xlang_mine_oracle_sql()

ORACLES["topic_tag"] = topic_tag_oracle_sql()

ORACLES["dedup_threshold_sweep"] = dedup_threshold_sweep_oracle_sql()

ORACLES["dedup_minhash_est"] = _minhash_cte() + f"""
select p.a, p.b,
       round(len([i for i in range(1, {dd.NUM_PERM} + 1)
                  if sa.sig[i] = sb.sig[i]])::double / {dd.NUM_PERM}, 6)
         as est_jaccard
from pairs p
join sig sa on sa.doc_id = p.a
join sig sb on sb.doc_id = p.b
"""

ORACLES["dedup_containment"] = _minhash_cte() + """
, sd as (select doc_id, list_distinct(shingles) as sd from sh)
select p.a, p.b,
       case when len(xa.sd) = 0 then 1.0
            else round(len(list_intersect(xa.sd, xb.sd))::double
                       / len(xa.sd), 6) end as cont_a_in_b,
       case when len(xb.sd) = 0 then 1.0
            else round(len(list_intersect(xa.sd, xb.sd))::double
                       / len(xb.sd), 6) end as cont_b_in_a
from pairs p
join sd xa on xa.doc_id = p.a
join sd xb on xb.doc_id = p.b
"""

# Rolling-hash winnowing fingerprint, emulated exactly in SQL: the engine
# computes h_i over 16-byte windows in numpy uint64 (wrap mod 2^64, then
# mask to 61 bits each step, stages/text.py:106-127); the oracle replays
# the identical recurrence per byte in an iterative CTE over HUGEINT with
# explicit positive-mod arithmetic, reading bytes from to_hex(encode()).
# The B^(w-1) table is computed here in pure Python int arithmetic.
def _rolling_oracle_sql() -> str:
    def bw_of(w: int) -> int:
        bw = 1
        for _ in range(w - 1):
            bw = ((bw * 1000003) % 2**64) % 2**61
        return bw

    bws = ", ".join(f"({w}, {bw_of(w)}::hugeint)" for w in range(1, 17))
    m64 = 18446744073709551616
    mask = 2305843009213693952
    return f"""
with src as (
  select doc_id, to_hex(encode(text)) as hx,
         octet_length(encode(text)) as n,
         least(16, octet_length(encode(text))) as w
  from documents),
bws(w, bw) as (values {bws}),
s2 as (select src.*, bws.bw from src join bws using (w) where n > 0),
r as (
  with recursive rr(doc_id, t, acc) as (
    select doc_id, 1,
           ('0x' || substr(hx, 1, 2))::ubigint::hugeint % {mask}
    from s2
    union all
    select rr.doc_id, rr.t + 1,
      case when rr.t + 1 <= s2.w then
        ((rr.acc * 1000003
          + ('0x' || substr(s2.hx, 2*(rr.t+1)-1, 2))::ubigint::hugeint)
          % {m64}) % {mask}
      else
        (((((rr.acc
             - ('0x' || substr(s2.hx, 2*(rr.t+1-s2.w)-1, 2))::ubigint::hugeint
               * s2.bw)
            * 1000003
            + ('0x' || substr(s2.hx, 2*(rr.t+1)-1, 2))::ubigint::hugeint)
           % {m64}) + {m64}) % {m64}) % {mask}
      end
    from rr join s2 using (doc_id) where rr.t < s2.n
  ) select * from rr
),
fp as (
  select r.doc_id, min(r.acc)::bigint as fingerprint64
  from r join s2 using (doc_id) where r.t >= s2.w group by r.doc_id)
select d.doc_id, coalesce(fp.fingerprint64, 0) as fingerprint64
from documents d left join fp using (doc_id)
"""


ORACLES["doc_fingerprint_rolling"] = _rolling_oracle_sql()


def _cdc_oracle_sql() -> str:
    """CDC chunk dedup replayed exactly in SQL: the SAME iterative
    HUGEINT rolling-hash CTE as the winnowing oracle (the two operators
    share one recurrence by construction — ``_rolling_accs``), then cut
    positions where acc % CDC_DIV = 0 (t >= window) plus the forced
    end-of-doc cut, chunks as hex substrings between consecutive cuts,
    chunk identity = md5 of the UPPERCASE hex (DuckDB ``to_hex``), and
    the same per-doc dup fold as the Ray dataflow."""
    base = _rolling_oracle_sql()
    head = base[: base.index("fp as (")]
    return head + f"""
cuts as (
  select r.doc_id, r.t
  from r join s2 using (doc_id)
  where r.t >= s2.w and r.acc % {tx.CDC_DIV} = 0
  union
  select doc_id, n from s2),
ch as (
  select doc_id, t as cut_end,
         lag(t, 1, 0) over (partition by doc_id order by t) as cut_start
  from cuts),
chunks as (
  select ch.doc_id,
         md5(substr(s2.hx, 2 * ch.cut_start + 1,
                    2 * (ch.cut_end - ch.cut_start))) as ck,
         ch.cut_end - ch.cut_start as clen
  from ch join s2 using (doc_id)),
freq as (select ck, count(distinct doc_id) as nd from chunks group by ck)
select c.doc_id,
       count(*)::bigint as n_chunks,
       sum(case when f.nd >= 2 then 1 else 0 end)::bigint as n_dup_chunks,
       sum(case when f.nd >= 2 then c.clen else 0 end)::bigint as dup_bytes,
       sum(c.clen)::bigint as total_bytes
from chunks c join freq f using (ck)
group by c.doc_id
"""


ORACLES["cdc_dedup"] = _cdc_oracle_sql()

# clusters = the full chain (LSH pairs -> Jaccard>=0.5 verify -> connected
# components); components via a recursive CTE (min reachable node id ==
# min-label-propagation fixpoint). The verify threshold applies to the
# 6-dp-rounded jaccard on both sides.
ORACLES["dedup_minhash_clusters"] = _minhash_cte() + """
, sd as (select doc_id, list_distinct(shingles) as sd from sh),
verified as (
  select p.a, p.b
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= 0.5),
edges as (select a as src, b as dst from verified
          union select b, a from verified)
select node as doc_id, rep_id from (
  with recursive r(node, reached) as (
    select src, src from edges
    union
    select r.node, e.dst from r join edges e on e.src = r.reached
  )
  select node, min(reached) as rep_id from r group by node
)
"""

# keep-best = the same cluster chain + token counts + per-cluster argmax
# (window rank on n_tokens desc, doc_id asc)
ORACLES["dedup_keep_best"] = _minhash_cte() + """
, sd as (select doc_id, list_distinct(shingles) as sd from sh),
verified as (
  select p.a, p.b
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= 0.5),
edges as (select a as src, b as dst from verified
          union select b, a from verified),
comp as (
  select node, rep_id from (
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached
    )
    select node, min(reached) as rep_id from r group by node
  )),
tc as (select doc_id,
              length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens
       from documents)
select rep_id, doc_id as keep_doc_id, n_members, n_tokens as best_n_tokens
from (
  select c.rep_id, c.node as doc_id, tc.n_tokens,
         row_number() over (partition by c.rep_id
                            order by tc.n_tokens desc, c.node asc) as rn,
         count(*) over (partition by c.rep_id) as n_members
  from comp c join tc on tc.doc_id = c.node)
where rn = 1
"""

ORACLES["tfidf_top_terms"] = """
with tf as (
  select doc_id, term, count(*)::bigint as tf
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '' group by doc_id, term),
df as (select term, count(*)::bigint as df from tf group by term),
n as (select count(*)::double as n_docs from documents),
scored as (
  select tf.doc_id, tf.term,
         round(tf.tf * ln((select n_docs from n) / df.df), 6) as tfidf
  from tf join df using (term)),
ranked as (
  select *, row_number() over (partition by doc_id
                               order by tfidf desc, term asc) as rn
  from scored)
select doc_id, term, tfidf from ranked where rn <= 3
"""

ORACLES["inverted_index"] = """
with posting as (
  select distinct term, doc_id
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> ''),
agg as (
  select term, count(*)::bigint as df,
         list(doc_id order by doc_id) as ids
  from posting group by term)
select term, df,
       array_to_string(list_slice(ids, 1, 10), ',') as postings
from agg
"""

def _simhash_cte_body() -> str:
    """CTE chain (no leading `with`) computing sim(doc_id, simhash) —
    the SQL replication of ``dd.simhash64`` over documents; shared by
    the signature, pair and cluster oracles."""
    return f"""
tk as (select doc_id,
              unnest({dd.SQL_TOKENIZE.format(col="text")}) as t
       from documents),
th as (select doc_id, ('0x' || substr(md5(t), 1, 16))::ubigint as h from tk),
bitix(bit) as (select unnest(range(64))),
bits as (
  select doc_id, bit,
         sum(case when (h >> bit) & 1 = 1 then 1 else -1 end) as acc
  from th cross join bitix group by doc_id, bit),
sim as (
  select doc_id,
         sum(case when acc > 0 then (1::hugeint << bit) else 0::hugeint end)
           ::ubigint as simhash
  from bits group by doc_id)
"""


ORACLES["dedup_simhash"] = "with " + _simhash_cte_body() + """
select doc_id, simhash,
       ((simhash >> 0) & 65535)::bigint as band0,
       ((simhash >> 16) & 65535)::bigint as band1,
       ((simhash >> 32) & 65535)::bigint as band2,
       ((simhash >> 48) & 65535)::bigint as band3
from sim
"""

# simhash pair CTE: band blocking + xor-popcount verify, replicating
# _simhash_band_pairs exactly (band math over the same sim() signatures)
_SIMHASH_PAIRS_TAIL = """,
sbandix(band_id) as (select unnest(range(4))),
sbands as (
  select doc_id, simhash, band_id,
         ((simhash >> (16 * band_id)) & 65535)::bigint as band_val
  from sim cross join sbandix),
spairs as (
  select distinct x.doc_id as a, y.doc_id as b,
         bit_count(xor(x.simhash, y.simhash))::bigint as hamming
  from sbands x join sbands y
    on x.band_id = y.band_id and x.band_val = y.band_val
   and x.doc_id < y.doc_id)
"""

ORACLES["dedup_simhash_pairs"] = (
    "with " + _simhash_cte_body() + _SIMHASH_PAIRS_TAIL
    + "select a, b, hamming from spairs where hamming <= 3"
)

ORACLES["dedup_simhash_clusters"] = (
    "with " + _simhash_cte_body() + _SIMHASH_PAIRS_TAIL + """,
sedges as (select a as src, b as dst from spairs where hamming <= 3
           union select b, a from spairs where hamming <= 3)
select node as doc_id, rep_id from (
  with recursive r(node, reached) as (
    select src, src from sedges
    union
    select r.node, e.dst from r join sedges e on e.src = r.reached
  )
  select node, min(reached) as rep_id from r group by node
)
"""
)

# cross-corpus incremental near-dedup: the minhash CTE's band table,
# cross-split candidate pairs, shingle-set Jaccard verify, per-new-doc
# rollup — replicating q_dedup_cross_corpus end to end
ORACLES["dedup_cross_corpus"] = _minhash_cte() + f""",
xp as (
  select distinct x.doc_id as a, y.doc_id as b
  from bands x join bands y
    on x.band_id = y.band_id and x.band_hash = y.band_hash
  where x.doc_id % {CROSS_MOD} = 0 and y.doc_id % {CROSS_MOD} <> 0),
xsd as (select doc_id, list_distinct(shingles) as sd from sh),
xverified as (
  select xp.a, xp.b
  from xp
  join xsd xa on xa.doc_id = xp.a
  join xsd xb on xb.doc_id = xp.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= {CROSS_TAU})
select a as new_doc_id, min(b) as match_doc_id,
       count(*)::bigint as n_matches
from xverified group by a
"""

ORACLES["script_mix"] = """
with pg as (
  select doc_id,
         text || ' ' || repeat('Привет мир ', doc_id % 3)
              || repeat('中文网页 ', doc_id % 4)
              || repeat('42 ', doc_id % 2) as page
  from documents),
c as (
  select doc_id,
         len(regexp_extract_all(page, '[A-Za-z]'))::bigint as n_latin,
         len(regexp_extract_all(page, '[\\x{0400}-\\x{04FF}]'))::bigint
           as n_cyrillic,
         len(regexp_extract_all(page, '[\\x{4E00}-\\x{9FFF}]'))::bigint
           as n_cjk,
         len(regexp_extract_all(page, '[0-9]'))::bigint as n_digit
  from pg)
select doc_id, n_latin, n_cyrillic, n_cjk, n_digit,
       case when n_latin + n_cyrillic + n_cjk + n_digit = 0 then 'none'
            when n_latin >= n_cyrillic and n_latin >= n_cjk
                 and n_latin >= n_digit then 'latin'
            when n_cyrillic >= n_cjk and n_cyrillic >= n_digit
                 then 'cyrillic'
            when n_cjk >= n_digit then 'cjk'
            else 'digit' end as dominant_script,
       (n_cyrillic + n_cjk) * 1000000
         // greatest(n_latin + n_cyrillic + n_cjk + n_digit, 1)
         as nonlatin_ppm
from c
"""

ORACLES["dedup_prefix"] = f"""
with p as (
  select doc_id,
         md5(array_to_string(
           list_slice(list_filter(string_split(text, ' '),
                                  w -> w <> ''), 1, {PREFIX_K}),
           ' ')) as prefix_md5
  from documents)
select prefix_md5, count(*)::bigint as n_docs,
       min(doc_id) as keep_doc_id
from p group by prefix_md5 having count(*) >= 2
"""

ORACLES["readability"] = """
with c as (
  select doc_id,
         len(regexp_extract_all(text, '\\S+'))::bigint as words,
         len(regexp_extract_all(text, '[.!?]+'))::bigint as sents,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::bigint as syl
  from documents),
g as (select doc_id, words, sents, syl,
             greatest(words, 1)::hugeint as w,
             greatest(sents, 1)::hugeint as s
      from c)
select doc_id, words as n_words, sents as n_sentences,
       syl as n_syllables,
       ((206835*s*w - 1015*w*w - 84600*syl::hugeint*s) // (s*w))::bigint
         as flesch_milli
from g
"""

ORACLES["decontaminate"] = f"""
with bench as (
  select distinct substr(text, {DECON_OFF + 1}, {DECON_LEN}) as phrase
  from documents
  where doc_id % {DECON_MOD} = 0 and doc_id < {DECON_MAX_ID}
        and length(text) >= {DECON_OFF + 1 + DECON_LEN}
)
select d.doc_id,
       coalesce(sum(case when instr(d.text, b.phrase) > 0
                         then 1 else 0 end), 0)::bigint as n_hits,
       (case when coalesce(sum(case when instr(d.text, b.phrase) > 0
                                    then 1 else 0 end), 0) > 0
             then 1 else 0 end)::int as contaminated
from documents d left join bench b on true
group by d.doc_id
"""

ORACLES["quality_gopher"] = """
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, w, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per)
select doc_id, n_words::bigint as n_words, n_distinct::bigint as n_distinct,
       w as top_word,
       round(c / n_words, 6) as top_frac,
       round((n_words - n_distinct) / n_words, 6) as dup_frac
from ranked where rn = 1
"""

ORACLES["repetition_signals"] = """
with docs as (
  select doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') as ws,
         list_filter(string_split(text, chr(10)), l -> l <> '') as ls
  from documents),
base as (select * from docs where len(ws) > 0),
lines as (
  select doc_id, count(*)::bigint as c, length(l)::bigint as nch
  from (select doc_id, unnest(ls) as l from base)
  group by doc_id, l),
lstats as (
  select doc_id,
         sum(c)::bigint as n_lines,
         round((sum(c) - count(*)) / sum(c), 6) as dup_line_frac,
         round(sum(nch * (c - 1)) / sum(nch * c), 6) as dup_line_char_frac
  from lines group by doc_id),
bgc as (
  select doc_id, g, count(*)::bigint as c
  from (select doc_id, ws[i] || ' ' || ws[i+1] as g
        from (select doc_id, ws, unnest(range(1, len(ws))) as i from base))
  group by doc_id, g),
bstats as (
  select doc_id,
         round(max(c) / sum(c), 6) as top_bigram_frac,
         round((sum(c) - count(*)) / sum(c), 6) as dup_bigram_frac
  from bgc group by doc_id),
tgc as (
  select doc_id, g, count(*)::bigint as c
  from (select doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as g
        from (select doc_id, ws, unnest(range(1, len(ws) - 1)) as i
              from base))
  group by doc_id, g),
tstats as (
  select doc_id,
         round(max(c) / sum(c), 6) as top_trigram_frac,
         round((sum(c) - count(*)) / sum(c), 6) as dup_trigram_frac
  from tgc group by doc_id)
select b.doc_id,
       coalesce(l.n_lines, 0)::bigint as n_lines,
       coalesce(l.dup_line_frac, 0.0) as dup_line_frac,
       coalesce(l.dup_line_char_frac, 0.0) as dup_line_char_frac,
       coalesce(bs.top_bigram_frac, 0.0) as top_bigram_frac,
       coalesce(bs.dup_bigram_frac, 0.0) as dup_bigram_frac,
       coalesce(ts.top_trigram_frac, 0.0) as top_trigram_frac,
       coalesce(ts.dup_trigram_frac, 0.0) as dup_trigram_frac
from base b
left join lstats l using (doc_id)
left join bstats bs using (doc_id)
left join tstats ts using (doc_id)
"""

ORACLES["char_entropy"] = """
with chars as (
  select doc_id, substr(text, i + 1, 1) as ch
  from (select doc_id, text, unnest(range(0, length(text))) as i
        from documents where length(text) > 0)),
cc as (select doc_id, ch, count(*)::double as c
       from chars group by doc_id, ch),
tot as (select doc_id, sum(c) as n from cc group by doc_id)
select cc.doc_id,
       count(*)::bigint as n_distinct_chars,
       round(-sum((c / n) * log2(c / n)), 6) as char_entropy
from cc join tot using (doc_id)
group by cc.doc_id
"""

ORACLES["domain_quota"] = f"""
with r as (
  select doc_id, source,
         row_number() over (partition by source
                            order by md5(cast(doc_id as varchar)), doc_id)
           as rn
  from documents)
select doc_id, source from r where rn <= {DOMAIN_QUOTA}
"""

ORACLES["length_quantiles"] = """
with qs as (
  select unnest(cast([0.1, 0.25, 0.5, 0.75, 0.9, 0.99] as double[])) as q),
ranked as (
  select n_chars, row_number() over (order by n_chars) as rn
  from documents),
n as (select count(*)::bigint as c from documents)
select qs.q as q, min(ranked.n_chars)::bigint as value
from qs, ranked, n
where ranked.rn >= ceiling(qs.q * n.c)
group by qs.q
"""

ORACLES["global_rank"] = """
select doc_id, n_chars,
       row_number() over (order by n_chars, doc_id) as rnk
from documents
"""

ORACLES["mojibake"] = """
with page as (
  select doc_id, text || ' ' || repeat('Ã©â€™Â« ', doc_id % 3) as page
  from documents),
c as (
  select doc_id,
         ((length(page) - length(replace(page, 'Ã', '')))
        + (length(page) - length(replace(page, 'â€', ''))) / 2
        + (length(page) - length(replace(page, 'Â', ''))))::bigint
           as n_mojibake
  from page)
select doc_id, n_mojibake,
       (case when n_mojibake > 0 then 1 else 0 end)::bigint as damaged
from c
"""

ORACLES["tokenizer_fertility"] = """
with c as (
  select lang,
         length(regexp_extract_all(text, '\\S+'))::bigint as w,
         length(regexp_extract_all(
             text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::bigint as s
  from documents)
select lang, sum(w)::bigint as n_words, sum(s)::bigint as n_subtokens,
       (sum(s) * 1000000 // greatest(sum(w), 1))::bigint as fertility_ppm
from c group by lang
"""

# the verified-cluster chain (identical to dedup_minhash_clusters), then
# per-cluster member counts, then the size histogram
ORACLES["dup_cluster_sizes"] = _minhash_cte() + """
, sd as (select doc_id, list_distinct(shingles) as sd from sh),
verified as (
  select p.a, p.b
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= 0.5),
edges as (select a as src, b as dst from verified
          union select b, a from verified),
comp as (
  select node, rep_id from (
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached
    )
    select node, min(reached) as rep_id from r group by node
  )),
cs as (select rep_id, count(*)::bigint as n_members from comp group by rep_id)
select n_members as cluster_size, count(*)::bigint as n_clusters,
       sum(n_members)::bigint as n_docs
from cs group by n_members
"""

def _kmeans_sql_cte() -> str:
    """The unrolled two-round Lloyd chain shared by the kmeans and
    cluster_sample oracles: deterministic init (K lowest vec_ids),
    assignment = argmin of distance rounded to 4 dp with lowest-cluster
    tie-break, centroids re-rounded to 6 dp each update — byte-for-byte
    the engine's recipe."""
    return f"""
with e as (select vec_id, embedding::double[] as v from embeddings),
c0 as (select (row_number() over (order by vec_id)) - 1 as cluster, v
       from (select * from e order by vec_id limit {KMEANS_K})),
a1 as (select vec_id, v, cluster from (
  select e.vec_id, e.v, c0.cluster,
         row_number() over (partition by e.vec_id
           order by round(list_distance(e.v, c0.v), 4) asc,
                    c0.cluster asc) as rn
  from e cross join c0) where rn = 1),
c1 as (select cluster, list(value order by pos) as v from (
  select cluster, pos, round(avg(val), 6) as value from (
    select cluster, unnest(v) as val, generate_subscripts(v, 1) as pos
    from a1)
  group by cluster, pos) group by cluster),
a2 as (select vec_id, v, cluster from (
  select e.vec_id, e.v, c1.cluster,
         row_number() over (partition by e.vec_id
           order by round(list_distance(e.v, c1.v), 4) asc,
                    c1.cluster asc) as rn
  from e cross join c1) where rn = 1),
n2 as (select cluster, count(*)::bigint as n_members from a2
       group by cluster),
c2 as (select cluster, pos::bigint as pos, round(avg(val), 6) as value
       from (select cluster, unnest(v) as val,
                    generate_subscripts(v, 1) as pos from a2)
       group by cluster, pos)
"""


ORACLES["kmeans"] = _kmeans_sql_cte() + """
select c2.cluster::bigint as cluster, c2.pos, c2.value, n2.n_members
from c2 join n2 using (cluster)
"""

ORACLES["cluster_sample"] = _kmeans_sql_cte() + f"""
, c2v as (select cluster, list(value order by pos) as v from c2
          group by cluster),
a3 as (select vec_id, cluster from (
  select e.vec_id, c2v.cluster,
         row_number() over (partition by e.vec_id
           order by round(list_distance(e.v, c2v.v), 4) asc,
                    c2v.cluster asc) as rn
  from e cross join c2v) where rn = 1),
ranked as (select cluster::bigint as cluster, vec_id,
                  md5(cast(vec_id as varchar)) as rk,
                  row_number() over (partition by cluster
                    order by md5(cast(vec_id as varchar)) asc) as qn
           from a3)
select cluster, vec_id, rk from ranked where qn <= {CLUSTER_SAMPLE_Q}
"""

ORACLES["label_centroids"] = """
with flat as (
  select label, unnest(embedding) as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings)
select label, pos::bigint as pos, round(avg(val), 6) as value
from flat group by label, pos
"""

ORACLES["pii_redact"] = f"""
with page as (
  select doc_id,
         text || ' contact user' || doc_id || '@mail' || (doc_id % 7) ||
         '.com visit http://site' || (doc_id % 13) || '.example/p' ||
         doc_id || ' call 555-' || lpad((doc_id % 10000)::varchar, 4, '0')
           as page
  from documents)
select doc_id,
       regexp_replace(regexp_replace(regexp_replace(page,
           '{tx.PII_URL}', '<URL>', 'g'),
           '{tx.PII_EMAIL}', '<EMAIL>', 'g'),
           '{tx.PII_PHONE}', '<PHONE>', 'g') as clean,
       length(regexp_extract_all(page, '{tx.PII_URL}'))::bigint as n_urls,
       length(regexp_extract_all(page, '{tx.PII_EMAIL}'))::bigint as n_emails,
       length(regexp_extract_all(page, '{tx.PII_PHONE}'))::bigint as n_phones
from page
"""

ORACLES["url_dedup"] = f"""
with derived as (
  select doc_id,
    case doc_id % 5
      when 0 then 'https://' || source || '.example.com/' || lang || '/'
        || (doc_id % 200)::varchar
        || '?utm_source=feed&utm_campaign=x&id=' || (doc_id % 97)::varchar
      when 1 then 'https://' || source || '.example.com/' || lang || '/'
        || (doc_id % 200)::varchar || '#section-2'
      when 2 then upper('HTTPS://' || source || '.example.com') || '/'
        || lang || '/' || (doc_id % 200)::varchar
      when 3 then 'https://' || source || '.example.com:443/' || lang || '/'
        || (doc_id % 200)::varchar
      else 'https://' || source || '.example.com/' || lang || '/'
        || (doc_id % 200)::varchar || '?id=' || (doc_id % 97)::varchar
    end as url
  from documents),
cleaned as (
  select doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(url, '#.*', '', 'g'),
      '\\?{tx.URL_TRACKING}', '?', 'g'),
      '&{tx.URL_TRACKING}', '', 'g'),
      '\\?&', '?', 'g'),
      '[?&]$', '', 'g') as u
  from derived),
split as (
  select doc_id,
    lower(regexp_extract(u, '^([^:]+)://([^/?#]*)(.*)$', 1)) as scheme,
    lower(regexp_extract(u, '^([^:]+)://([^/?#]*)(.*)$', 2)) as host,
    regexp_extract(u, '^([^:]+)://([^/?#]*)(.*)$', 3) as rest
  from cleaned),
canon as (
  select doc_id,
    scheme || '://'
    || case when scheme = 'https' then regexp_replace(host, ':443$', '')
            when scheme = 'http' then regexp_replace(host, ':80$', '')
            else host end
    || rest as canon_url
  from split)
select canon_url, min(doc_id) as keep_doc_id, count(*)::bigint as n_variants
from canon group by canon_url
"""

ORACLES["lm_score"] = """
with tok as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
cnt as (select w, count(*)::bigint as c from tok group by w),
tot as (select count(*)::double as t from tok)
select doc_id, count(*)::bigint as n_tokens,
       round(sum(log2(t / c)) / count(*), 6) as lm_bits
from tok join cnt using (w) cross join tot
group by doc_id
"""

ORACLES["lm_bigram"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
tok as (
  select doc_id, unnest(ws) as w, unnest(range(1, len(ws) + 1)) as pos
  from base where len(ws) > 0),
tok2 as (
  select doc_id, pos, w,
         lag(w) over (partition by doc_id order by pos) as w1
  from tok),
uni as (select w, count(*)::bigint as c from tok group by w),
tot as (select count(*)::double as t from tok),
big as (select w1, w as w2, count(*)::bigint as cb
        from tok2 where w1 is not null group by w1, w),
ctx as (select w1, count(*)::bigint as cc
        from tok2 where w1 is not null group by w1),
bits as (
  select t2.doc_id,
         case when t2.w1 is null then log2(tot.t / u.c)
              else -log2({LM_LAMBDA!r} * (b.cb::double / x.cc)
                         + {1.0 - LM_LAMBDA!r} * (u.c / tot.t)) end as b
  from tok2 t2
  join uni u on u.w = t2.w
  left join big b on b.w1 = t2.w1 and b.w2 = t2.w
  left join ctx x on x.w1 = t2.w1
  cross join tot)
select doc_id, count(*)::bigint as n_tokens,
       round(sum(b) / count(*), 6) as lm2_bits
from bits group by doc_id
"""

def _heavy_hitters_sql() -> str:
    from ..stages.sketch import CMS_DEPTH, CMS_WIDTH

    def cell(w: str, j: str) -> str:
        return (
            f"(('0x' || substr(md5({w} || ':' || {j}::varchar), 1, 15))"
            f"::ubigint % {CMS_WIDTH})::bigint"
        )

    return f"""
with tok as (
  select unnest(list_filter(string_split(text, ' '), w -> w <> '')) as w
  from documents),
wc as (select w, count(*)::bigint as c from tok group by w),
cells as (
  select j, {cell("w", "j")} as pos, sum(c)::bigint as v
  from wc cross join generate_series(0, {CMS_DEPTH - 1}) t(j)
  group by j, pos),
tot as (select sum(v)::bigint as t from cells where j = 0),
est as (
  select w as word, min(v)::bigint as est
  from (
    select wc.w, cells.v
    from wc
    cross join generate_series(0, {CMS_DEPTH - 1}) g(j)
    join cells on cells.j = g.j
              and cells.pos = {cell("wc.w", "g.j")}
  ) group by w)
select word, est
from est cross join tot
where est >= (t + {HH_DENOM - 1}) // {HH_DENOM}
"""


ORACLES["heavy_hitters"] = _heavy_hitters_sql()

ORACLES["line_dedup"] = f"""
with base as (
  select doc_id, source, lang,
         list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
lines as (
  select doc_id, 0::bigint as line_no,
         'home about contact ' || source || ' navigation menu' as line
  from base
  union all
  select doc_id, (s // {tx.LINE_TOKENS})::bigint + 1 as line_no,
         array_to_string(list_slice(ws, s + 1, s + {tx.LINE_TOKENS}), ' ')
           as line
  from (select doc_id, ws, unnest(range(0, len(ws), {tx.LINE_TOKENS})) as s
        from base)
  union all
  select doc_id, 1000000::bigint as line_no,
         'copyright footer ' || lang || ' all rights reserved' as line
  from base),
freq as (select line, count(distinct doc_id) as nd from lines group by line)
select l.doc_id,
       count(*)::bigint as n_lines,
       sum(case when f.nd < {LINE_MIN_DOCS} then 1 else 0 end)::bigint
         as n_kept,
       coalesce(string_agg(case when f.nd < {LINE_MIN_DOCS} then l.line end,
                           chr(10) order by l.line_no), '') as text_clean
from lines l join freq f using (line)
group by l.doc_id
"""

ORACLES["tfidf_cosine_pairs"] = f"""
with tf as (
  select doc_id, term, count(*)::bigint as tf
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '' group by doc_id, term),
df as (select term, count(*)::bigint as df from tf group by term),
n as (select count(*)::double as n_docs from documents),
w as (
  select tf.doc_id, tf.term, df.df,
         tf.tf * ln((select n_docs from n) / df.df) as w
  from tf join df using (term)
  where df.df <= {TFIDF_COS_DF_CAP}),
nrm as (select doc_id, sqrt(sum(w * w)) as nrm from w group by doc_id),
dot as (
  select x.doc_id as a, y.doc_id as b, sum(x.w * y.w) as dot
  from w x join w y on x.term = y.term and x.doc_id < y.doc_id
  where x.df >= 2
  group by x.doc_id, y.doc_id)
select d.a, d.b, round(d.dot / (na.nrm * nb.nrm), 4) as cos
from dot d
join nrm na on na.doc_id = d.a
join nrm nb on nb.doc_id = d.b
where round(d.dot / (na.nrm * nb.nrm), 4) >= {TFIDF_COS_TAU}
"""

ORACLES["media_phash_pairs"] = f"""
with h as (
  select doc_id,
         xor(('0x' || substr(md5('g' || (doc_id // 5)), 1, 15))
               ::ubigint::bigint,
             (case when doc_id % 5 <> 0
                   then (1::bigint << ((doc_id * 7) % {PHASH_BITS}))
                   else 0 end)
             | (case when doc_id % 5 >= 3
                     then (1::bigint << ((doc_id * 13) % {PHASH_BITS}))
                     else 0 end)) as phash
  from documents),
b as (
  select doc_id, phash, k, (phash >> (15 * k)) & 32767 as bv
  from h cross join (select unnest(range({PHASH_BANDS})) as k)),
cand as (
  select distinct x.doc_id as a, y.doc_id as b
  from b x join b y on x.k = y.k and x.bv = y.bv
                    and x.doc_id < y.doc_id)
select c.a, c.b,
       bit_count(xor(ha.phash, hb.phash))::bigint as hamming
from cand c
join h ha on ha.doc_id = c.a
join h hb on hb.doc_id = c.b
where bit_count(xor(ha.phash, hb.phash)) <= {PHASH_HAM_T}
"""

ORACLES["dedup_phash_clusters"] = f"""
with pr as ({ORACLES["media_phash_pairs"]}),
edges as (select a as src, b as dst from pr
          union select b, a from pr)
select node as doc_id, rep_id from (
  with recursive r(node, reached) as (
    select src, src from edges
    union
    select r.node, e.dst from r join edges e on e.src = r.reached
  )
  select node, min(reached) as rep_id from r group by node
)
"""

ORACLES["robots_filter"] = f"""
with u as (
  select doc_id, doc_id % 13 as k,
         'https://'
           || case when doc_id % 23 = 0 then 'adult-xxx-' else '' end
           || 'site' || (doc_id % 13) || '.example/'
           || case when doc_id % 19 = 0 then 'casino/' else '' end
           || 'page' || doc_id
           || case when doc_id % 29 = 0
                   then '?promo=cheap-pills-online' else '' end as url
  from documents),
p as (select doc_id, url, k,
             '/' || split_part(url, '.example/', 2) as path
      from u)
select doc_id, url,
       (starts_with(path, '/casino/')
        or (k % 3 = 0 and starts_with(path, '/page1'))) as blocked
from p
"""

ORACLES["decontaminate_semantic"] = f"""
with b as (select embedding from embeddings
           where vec_id % {DECON_SEM_MOD} = 0),
c as (select vec_id, embedding from embeddings
      where vec_id % {DECON_SEM_MOD} <> 0)
select c.vec_id,
       max(round(list_cosine_similarity(c.embedding::double[],
                                        b.embedding::double[]), 4))
         as max_sim,
       max(round(list_cosine_similarity(c.embedding::double[],
                                        b.embedding::double[]), 4))
         >= {DECON_SEM_TAU} as contaminated
from c cross join b
group by c.vec_id
"""


def _lang_count_sql(words: list[str]) -> str:
    return " + ".join(
        f"length(regexp_extract_all(page, '\\b{w}\\b'))" for w in words
    )


ORACLES["lang_id_multi"] = f"""
with p as (
  select doc_id,
         text || repeat(case doc_id % 4
                        when 0 then ' {" ".join(LANG_WORDS["en"])}'
                        when 1 then ' {" ".join(LANG_WORDS["de"])}'
                        when 2 then ' {" ".join(LANG_WORDS["fr"])}'
                        else ' {" ".join(LANG_WORDS["es"])}' end,
                        1 + doc_id % 3) as page
  from documents),
c as (
  select doc_id,
         length(regexp_extract_all(page, '\\S+'))::bigint as n_tokens,
         ({_lang_count_sql(LANG_WORDS["en"])})::bigint as s_en,
         ({_lang_count_sql(LANG_WORDS["de"])})::bigint as s_de,
         ({_lang_count_sql(LANG_WORDS["fr"])})::bigint as s_fr,
         ({_lang_count_sql(LANG_WORDS["es"])})::bigint as s_es
  from p)
select doc_id, n_tokens,
       case when greatest(s_en, s_de, s_fr, s_es) * 100
                 < {LANG_MIN_DENSITY_PCT} * greatest(n_tokens, 1)
              then 'und'
            when s_en >= s_de and s_en >= s_fr and s_en >= s_es then 'en'
            when s_de >= s_fr and s_de >= s_es then 'de'
            when s_fr >= s_es then 'fr'
            else 'es' end as pred_lang
from c
"""

ORACLES["domain_reputation"] = f"""
with f as (
  select doc_id, source,
         length(regexp_extract_all(text, '\\S+'))::bigint as tok,
         ({_stop_count_sql()})::bigint as stop
  from documents),
d as (
  select source,
         round(sum(stop) * 1.0 / greatest(sum(tok), 1), 6) as domain_score
  from f group by source)
select f.doc_id, f.source, d.domain_score,
       d.domain_score >= {DOMAIN_REP_MIN_STOP} as keep
from f join d using (source)
"""

ORACLES["url_filter"] = f"""
with u as (
  select doc_id,
         'https://'
           || case when doc_id % 23 = 0 then 'adult-xxx-' else '' end
           || 'site' || (doc_id % 13) || '.example/'
           || case when doc_id % 19 = 0 then 'casino/' else '' end
           || 'page' || doc_id
           || case when doc_id % 29 = 0
                   then '?promo=cheap-pills-online' else '' end as url
  from documents)
select doc_id, url,
       ({" + ".join(f"contains(url, '{w}')::bigint" for w in BAD_URL_WORDS)})
         as n_bad,
       ({" + ".join(f"contains(url, '{w}')::bigint" for w in BAD_URL_WORDS)})
         = 0 as keep
from u
"""

ORACLES["line_dedup_domain"] = f"""
with base as (
  select doc_id, source, lang,
         list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
lines as (
  select doc_id, source, 0::bigint as line_no,
         'home about contact ' || source || ' navigation menu' as line
  from base
  union all
  select doc_id, source, (s // {tx.LINE_TOKENS})::bigint + 1 as line_no,
         array_to_string(list_slice(ws, s + 1, s + {tx.LINE_TOKENS}), ' ')
           as line
  from (select doc_id, source, ws,
               unnest(range(0, len(ws), {tx.LINE_TOKENS})) as s
        from base)
  union all
  select doc_id, source, 1000000::bigint as line_no,
         'copyright footer ' || lang || ' all rights reserved' as line
  from base),
nd as (select source, count(*)::bigint as n_docs from base group by source),
freq as (select source, line, count(distinct doc_id) as df
         from lines group by source, line),
flagged as (
  select f.source, f.line,
         (f.df >= {DOMAIN_LINE_MIN}
          and f.df * 100 >= {DOMAIN_LINE_PCT} * n.n_docs) as dropit
  from freq f join nd n using (source))
select l.doc_id,
       count(*)::bigint as n_lines,
       sum(case when not d.dropit then 1 else 0 end)::bigint as n_kept,
       coalesce(string_agg(case when not d.dropit then l.line end,
                           chr(10) order by l.line_no), '') as text_clean
from lines l join flagged d on l.source = d.source and l.line = d.line
group by l.doc_id
"""

ORACLES["clean_c4"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
lines as (
  select doc_id, -1::bigint as line_no,
         'please enable javascript and cookies to continue.' as line
  from base where doc_id % 7 = 0
  union all
  select doc_id, (s // {tx.LINE_TOKENS})::bigint as line_no,
         array_to_string(list_slice(ws, s + 1, s + {tx.LINE_TOKENS}), ' ')
           || case (doc_id + (s // {tx.LINE_TOKENS})) % 4
                when 0 then '.' when 1 then '' when 2 then '!'
                else '?' end as line
  from (select doc_id, ws, unnest(range(0, len(ws), {tx.LINE_TOKENS})) as s
        from base)
  union all
  select doc_id, 1000000::bigint as line_no,
         'lorem ipsum dolor sit amet consectetur adipiscing elit.' as line
  from base where doc_id % 31 = 0
  union all
  select doc_id, 1000001::bigint as line_no,
         'function badge() {{ return 1; }}' as line
  from base where doc_id % 29 = 0),
page as (
  select doc_id, count(*)::bigint as n_lines,
         string_agg(line, chr(10) order by line_no) as page
  from lines group by doc_id),
k as (
  select doc_id, count(*)::bigint as n_kept,
         string_agg(line, chr(10) order by line_no) as text_clean
  from lines
  where regexp_matches(line, '[.!?"]$')
    and len(string_split(line, ' ')) >= {tx.C4_MIN_LINE_WORDS}
    and not contains(lower(line), 'javascript')
  group by doc_id)
select p.doc_id, p.n_lines, k.n_kept, k.text_clean
from page p join k using (doc_id)
where not contains(lower(p.page), 'lorem ipsum')
  and not contains(p.page, '{{')
  and k.n_kept >= {tx.C4_MIN_KEPT_LINES}
"""

ORACLES["chunk_windows"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
wins as (
  select doc_id, ws, unnest(range(0, len(ws), {tx.CHUNK_STRIDE})) as s
  from base where len(ws) > 0)
select doc_id, (s // {tx.CHUNK_STRIDE})::bigint as chunk_id,
       least({tx.CHUNK_TOKENS}, len(ws) - s)::bigint as n_tokens,
       array_to_string(list_slice(ws, s + 1, s + {tx.CHUNK_TOKENS}), ' ')
         as chunk
from wins
"""

ORACLES["pack_sequences"] = f"""
with tc as (
  select doc_id,
         length(regexp_extract_all(text, '[^ ]+'))::bigint as n_tokens
  from documents),
c as (
  select doc_id, n_tokens,
         coalesce(sum(n_tokens) over (order by doc_id
             rows between unbounded preceding and 1 preceding), 0)::bigint
           as start_tok
  from tc)
select doc_id, n_tokens, start_tok,
       (start_tok // {PACK_BUDGET})::bigint as seq_id
from c
"""

ORACLES["bigram_topk"] = f"""
with t as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
w as (select doc_id, unnest(ws) as w, generate_subscripts(ws, 1) as pos
      from t),
bg as (select a.w || ' ' || b.w as bigram
       from w a join w b on b.doc_id = a.doc_id and b.pos = a.pos + 1),
cnt as (select bigram, count(*)::bigint as n from bg group by bigram),
r as (select *, row_number() over (order by n desc, bigram asc) as rn
      from cnt)
select bigram, n from r where rn <= {BIGRAM_K}
"""

ORACLES["quality_tiers"] = f"""
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, w, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per),
s as (
  select doc_id, n_words,
         round(c / n_words, 6) as top_frac,
         round((n_words - n_distinct) / n_words, 6) as dup_frac
  from ranked where rn = 1)
select doc_id,
       case when n_words < {tx.TIER_LOW_WORDS} or dup_frac >= {tx.TIER_LOW_DUP}
                 or top_frac >= {tx.TIER_LOW_TOP} then 'low'
            when n_words >= {tx.TIER_HIGH_WORDS} and dup_frac < {tx.TIER_HIGH_DUP}
                 and top_frac < {tx.TIER_HIGH_TOP} then 'high'
            else 'mid' end as tier,
       n_words::bigint as n_words, top_frac, dup_frac
from s
"""

ORACLES["join_skewed"] = f"""
with fat as (
  select event_id,
         case when event_id % 4 <> 0 then 0
              else event_id % {SKEW_DIM} end as k,
         cast(floor(value * 1000000 + 0.5) as bigint) as micro
  from events),
dim as (
  select b::bigint as k, ((b * 7) % 13 + 1)::bigint as mult
  from unnest(range(0, {SKEW_DIM})) t(b))
select f.k, count(*)::bigint as n_events,
       sum(f.micro * d.mult)::bigint as weighted_micro
from fat f join dim d using (k)
group by f.k
"""

ORACLES["redirects"] = f"""
with ids as (select doc_id as id from documents),
nxt as (select id,
               case when id % {REDIR_BLOCK} = 0 then id else id - 1 end
                 as nxt
        from ids),
walk as (
  with recursive r(id, cur, hops) as (
    select id, id, 0 from ids
    union all
    select r.id, n.nxt, r.hops + 1
    from r join nxt n on n.id = r.cur
    where n.nxt <> r.cur
  )
  select id, cur, hops,
         row_number() over (partition by id order by hops desc) as rn
  from r)
select 'https://r.example/p' || id as url,
       'https://r.example/p' || cur as final_url,
       hops::bigint as hops
from walk where rn = 1
"""

ORACLES["filter_agreement"] = f"""
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, w, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per),
s as (
  select doc_id, n_words,
         round(c / n_words, 6) as top_frac,
         round((n_words - n_distinct) / n_words, 6) as dup_frac
  from ranked where rn = 1),
tiers as (
  select doc_id,
         case when n_words < {tx.TIER_LOW_WORDS}
                   or dup_frac >= {tx.TIER_LOW_DUP}
                   or top_frac >= {tx.TIER_LOW_TOP} then 'low'
              when n_words >= {tx.TIER_HIGH_WORDS}
                   and dup_frac < {tx.TIER_HIGH_DUP}
                   and top_frac < {tx.TIER_HIGH_TOP} then 'high'
              else 'mid' end as tier
  from s),
tri as (
  select doc_id, substr(text, i, 3) as g
  from documents, unnest(range(1, length(text) - 1)) as r(i)),
feats as (
  select doc_id,
         (('0x' || substr(md5(g), 1, 8))::uinteger
          % {HASH_FEATURE_BUCKETS})::bigint as bucket,
         count(*)::bigint as n
  from tri group by 1, 2),
w as (
  select b::bigint as bucket,
         ((('0x' || substr(md5(b::varchar), 1, 8))::uinteger
           % {LOGIT_WEIGHT_SPAN})::bigint - 500000) as w
  from unnest(range(0, {HASH_FEATURE_BUCKETS})) t(b)),
lg as (
  select f.doc_id, (sum(f.n * w.w) // greatest(sum(f.n), 1))::bigint
           as logit
  from feats f join w using (bucket) group by f.doc_id),
k as (
  select d.doc_id,
         (case when coalesce(lg.logit, 0) > 0 then 1 else 0 end)::bigint
           as keep
  from documents d left join lg using (doc_id))
select t.tier, k.keep, count(*)::bigint as n_docs,
       (count(*) * 1000000 //
        (select greatest(count(*), 1) from documents))::bigint as share_ppm
from tiers t join k using (doc_id)
group by t.tier, k.keep
"""

ORACLES["split_token_budget"] = f"""
with b as (
  select doc_id,
         (('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::ubigint
          % {SPLIT_BUCKETS})::bigint as bucket,
         length(regexp_extract_all(text, '\\S+'))::bigint as toks
  from documents),
s as (select case when bucket < {SPLIT_TRAIN} then 'train'
                  when bucket < {SPLIT_VALID} then 'valid'
                  else 'test' end as split, toks from b),
a as (select split, count(*)::bigint as n_docs,
             sum(toks)::bigint as n_tokens from s group by split),
tot as (select greatest(sum(n_tokens), 1) as tt from a)
select split, n_docs, n_tokens,
       (n_tokens * 1000000 // tot.tt)::bigint as token_share_ppm
from a, tot
"""

ORACLES["domain_stats"] = """
select source, lang, count(*)::bigint as n_docs,
       sum(n_chars)::bigint as total_chars,
       round(sum(n_chars)::double / count(*), 6) as avg_chars
from documents group by source, lang
"""

ORACLES["decontaminate_ngram"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
grams as (
  select doc_id,
         array_to_string(list_slice(ws, i, i + {tx.DECON_NGRAM} - 1), ' ')
           as g
  from (select doc_id, ws,
               unnest(range(1, len(ws) - {tx.DECON_NGRAM} + 2)) as i
        from base where len(ws) >= {tx.DECON_NGRAM})),
bench as (
  select distinct g from grams
  where doc_id % {DECON_MOD} = 0 and doc_id < {DECON_MAX_ID}),
hits as (
  select d.doc_id, count(distinct d.g)::bigint as n_gram_hits
  from grams d join bench b using (g) group by d.doc_id)
select doc.doc_id,
       coalesce(h.n_gram_hits, 0)::bigint as n_gram_hits,
       (case when coalesce(h.n_gram_hits, 0) > 0 then 1 else 0 end)::int
         as contaminated
from documents doc left join hits h using (doc_id)
"""

ORACLES["dedup_substring"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
wins as (
  select doc_id, i,
         array_to_string(list_slice(ws, i, i + {tx.SUBSTR_W} - 1), ' ') as w
  from (select doc_id, ws,
               unnest(range(1, len(ws) - {tx.SUBSTR_W} + 2,
                            {tx.SUBSTR_STRIDE})) as i
        from base where len(ws) >= {tx.SUBSTR_W})),
freq as (select w from wins group by w
         having count(distinct doc_id) >= 2),
cov as (
  select distinct doc_id, unnest(range(i, i + {tx.SUBSTR_W})) as pos
  from wins where w in (select w from freq)),
tok as (select doc_id, unnest(ws) as tokw, generate_subscripts(ws, 1) as p
        from base),
kept as (
  select t.doc_id, t.p, t.tokw
  from tok t left join cov c on c.doc_id = t.doc_id and c.pos = t.p
  where c.pos is null),
agg as (
  select doc_id, count(*)::bigint as n_kept,
         string_agg(tokw, ' ' order by p) as text_dedup
  from kept group by doc_id)
select b.doc_id, len(b.ws)::bigint as n_tokens,
       (len(b.ws) - coalesce(a.n_kept, 0))::bigint as n_removed,
       coalesce(a.text_dedup, '') as text_dedup
from base b left join agg a using (doc_id)
"""

ORACLES["build_training_set"] = f"""
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per),
s as (
  select doc_id, n_words,
         round(c / n_words, 6) as top_frac,
         round((n_words - n_distinct) / n_words, 6) as dup_frac
  from ranked where rn = 1),
tiered as (
  select doc_id from s
  where not (n_words < {tx.TIER_LOW_WORDS} or dup_frac >= {tx.TIER_LOW_DUP}
             or top_frac >= {tx.TIER_LOW_TOP})),
kept as (select d.doc_id, d.text from documents d join tiered using (doc_id)),
uniq as (
  select doc_id, text from (
    select doc_id, text,
           row_number() over (partition by md5(text) order by doc_id) as rn
    from kept)
  where rn = 1),
base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from uniq),
chunks as (
  select doc_id, (s // {tx.CHUNK_STRIDE})::bigint as chunk_id,
         least({tx.CHUNK_TOKENS}, len(ws) - s)::bigint as n_tokens
  from (select doc_id, ws, unnest(range(0, len(ws), {tx.CHUNK_STRIDE})) as s
        from base where len(ws) > 0)),
packed as (
  select doc_id, chunk_id, n_tokens,
         coalesce(sum(n_tokens) over (order by doc_id, chunk_id
             rows between unbounded preceding and 1 preceding), 0)::bigint
           as start_tok
  from chunks)
select doc_id, chunk_id, n_tokens, start_tok,
       (start_tok // {PACK_BUDGET})::bigint as seq_id
from packed
"""

ORACLES["mix_rebalance"] = f"""
with c as (select lang, count(*)::bigint as n from documents group by lang),
m as (select min(n) as cmin from c),
r as (select lang, ({MIX_SCALE} * (select cmin from m)) // n as rate from c)
select d.doc_id, d.lang
from documents d join r using (lang)
where ('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))::uinteger
      % {MIX_SCALE} < r.rate
"""


def _link_pages_sql(pages_dir: str) -> str:
    return (
        "select url, html from read_parquet("
        f"'{pages_dir}/*.parquet')"
    )


def outlinks_oracle_sql(pages_dir: str) -> str:
    """regexp_extract_all over the decoded html replays the engine's
    compiled-regex finditer occurrence-for-occurrence (multigraph)."""
    return f"""
select url as src,
       unnest(regexp_extract_all(decode(html), 'href="([^"]*)"', 1)) as dst
from ({_link_pages_sql(pages_dir)})
"""


def indegree_oracle_sql(pages_dir: str) -> str:
    return f"""
select dst as url, count(*)::bigint as in_degree
from ({outlinks_oracle_sql(pages_dir)})
group by dst
"""


def anchor_text_oracle_sql(pages_dir: str) -> str:
    """Two-step regexp replay of q_anchor_text's single two-group
    finditer (DuckDB's regexp_extract_all yields one group, so the
    oracle extracts whole <a> tags first, then each group)."""
    return f"""
with tags as (
  select unnest(regexp_extract_all(
           decode(html), '<a href="[^"]*">[^<]*</a>')) as tag
  from ({_link_pages_sql(pages_dir)})),
pairs as (
  select regexp_extract(tag, 'href="([^"]*)"', 1) as dst,
         regexp_extract(tag, '>([^<]*)<', 1) as anchor
  from tags)
select dst as url,
       count(*)::bigint as n_anchors,
       count(distinct anchor)::bigint as n_distinct_anchors,
       min(anchor) as top_anchor
from pairs
group by dst
"""


def html_meta_oracle_sql(pages_dir: str) -> str:
    return f"""
select url,
       nullif(regexp_extract(decode(html), '<title>([^<]*)</title>', 1),
              '') as title,
       nullif(regexp_extract(decode(html), '<p>([^<]*)</p>', 1), '')
         as first_para,
       len(regexp_extract_all(decode(html), 'href="[^"]*"'))::bigint
         as n_links
from ({_link_pages_sql(pages_dir)})
"""


def snapshot_latest_oracle_sql(pages_dir: str) -> str:
    return f"""
select url, warc_ts, n_snapshots, text from (
  select url, warc_ts, text,
         count(*) over (partition by url)::bigint as n_snapshots,
         row_number() over (partition by url
                            order by warc_ts desc) as rn
  from read_parquet('{pages_dir}/*.parquet'))
where rn = 1
"""


def reciprocal_oracle_sql(pages_dir: str) -> str:
    return f"""
with links as ({outlinks_oracle_sql(pages_dir)}),
e as (select distinct src, dst from links where src <> dst)
select a.src as a, a.dst as b
from e a join e b on a.src = b.dst and a.dst = b.src
where a.src < a.dst
"""


def pagerank_oracle_sql(pages_dir: str, n: int = LINK_N) -> str:
    """Explicit 5-iteration unrolled replay of q_pagerank's integer
    fixed-point recurrence: same floor divisions (DuckDB ``//`` on
    bigints), same exact integer sums (order-independent), ghost-zero
    semantics via coalesce(s, 0) — bit-equality with both engine routes,
    ending in the identical single int->double division."""
    r0 = PR_SCALE // n
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
    iters = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
r{k} as (
  select p.url,
         {base} + ({PR_DAMP_NUM} * coalesce(s.s, 0)) // {PR_DAMP_DEN} as r
  from pages p left join (
    select e.dst as url, sum(rp.r // e.od)::bigint as s
    from edges e join {prev} rp on e.src = rp.url
    group by e.dst) s using (url))""")
        prev = f"r{k}"
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
links as ({outlinks_oracle_sql(pages_dir)}),
outdeg as (select src, count(*)::bigint as od from links group by src),
edges as (select l.src, l.dst, o.od from links l join outdeg o using (src)),
pages as (select url from pages_raw),
r0 as (select url, {r0}::bigint as r from pages),{",".join(iters)}
select url, r / {PR_SCALE}.0 as pagerank from {prev}
"""


def _domain_similarity_oracle_sql() -> str:
    perms = ", ".join(
        f"({i}, {a}::hugeint, {b}::hugeint)"
        for i, (a, b) in enumerate(zip(dd.PERM_A, dd.PERM_B))
    )
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with toks as (
  select source, {tokenize} as toks from documents),
sh as (
  select source,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
shu as (select source, unnest(shingles) as s from sh),
hv as (select source,
              ('0x' || substr(md5(s), 1, 16))::ubigint as h from shu),
perms(p_idx, a, b) as (values {perms}),
pv as (
  select source, p_idx,
         min(((a * h::hugeint + b) % 18446744073709551616::hugeint)::ubigint)
           as mh
  from hv cross join perms group by source, p_idx)
select a.source as src_a, b.source as src_b,
       sum(case when a.mh = b.mh then 1 else 0 end)::bigint as agree,
       round(sum(case when a.mh = b.mh then 1 else 0 end)
             / {dd.NUM_PERM}.0, 6) as est_jaccard
from pv a join pv b on a.p_idx = b.p_idx and a.source < b.source
group by 1, 2
"""


ORACLES["domain_similarity"] = _domain_similarity_oracle_sql()

ORACLES["dedup_editdist"] = _minhash_cte() + f"""
select p.a, p.b,
       levenshtein(substr(xa.text, 1, {EDITDIST_CAP}),
                   substr(xb.text, 1, {EDITDIST_CAP}))::bigint as editdist,
       (case when greatest(strlen(substr(xa.text, 1, {EDITDIST_CAP})),
                           strlen(substr(xb.text, 1, {EDITDIST_CAP}))) = 0
             then 1000000
             else (greatest(strlen(substr(xa.text, 1, {EDITDIST_CAP})),
                            strlen(substr(xb.text, 1, {EDITDIST_CAP})))
                   - levenshtein(substr(xa.text, 1, {EDITDIST_CAP}),
                                 substr(xb.text, 1, {EDITDIST_CAP})))
                  * 1000000
                  // greatest(strlen(substr(xa.text, 1, {EDITDIST_CAP})),
                              strlen(substr(xb.text, 1, {EDITDIST_CAP})))
        end)::bigint as sim_ppm
from pairs p
join documents xa on xa.doc_id = p.a
join documents xb on xb.doc_id = p.b
"""

ORACLES["dedup_funnel"] = f"""
with f as (
  select doc_id,
         length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens,
         case when ({_stop_count_sql()}) * 1.0 /
                   greatest(length(regexp_extract_all(text, '\\S+')), 1)
                   > 0.05
              then 'en' else 'und' end as predicted_lang,
         md5(text) as content_md5
  from documents)
select 'input' as stage, 0::bigint as stage_idx, count(*)::bigint as n
from f
union all
select 'quality', 1, count(*)::bigint from f where n_tokens >= 20
union all
select 'lang', 2, count(*)::bigint from f
where n_tokens >= 20 and predicted_lang = 'en'
union all
select 'exact_dedup', 3, count(distinct content_md5)::bigint from f
where n_tokens >= 20 and predicted_lang = 'en'
"""

ORACLES["monthly_growth"] = """
with m as (select (year(o_orderdate) * 100 + month(o_orderdate))::bigint
                    as ym,
                  round(sum(o_totalprice), 2) as revenue
           from orders group by 1),
w as (select ym, revenue, lag(revenue) over (order by ym) as prev from m)
select ym, revenue, round(revenue / prev - 1.0, 6) as growth
from w where prev is not null
"""

ORACLES["lang_confusion"] = (
    f"select lang, case when ({_stop_count_sql()}) * 1.0 / "
    "greatest(length(regexp_extract_all(text, '\\S+')), 1) > 0.05 "
    "then 'en' else 'und' end as predicted_lang, count(*)::bigint as n "
    "from documents group by 1, 2"
)

ORACLES["profile_table"] = " union all ".join(
    f"select '{c}' as \"column\", count(*)::bigint as n_rows, "
    f"(count(*) - count({c}))::bigint as n_null, "
    f"count(distinct {c})::bigint as n_distinct from orders"
    for c in PROFILE_COLUMNS
)

ORACLES["k_anonymity"] = f"""
select c_nationkey::bigint as c_nationkey, c_mktsegment,
       count(*)::bigint as n,
       (case when count(*) < {K_ANON} then 1 else 0 end)::bigint as at_risk
from customer group by 1, 2
"""

ORACLES["session_paths"] = f"""
with ordered as (
  select user_id, ts, event_id, event_type,
         case when ts - lag(ts) over w > interval {SESSION_GAP_S} seconds
                   or lag(ts) over w is null
              then 1 else 0 end as new_session
  from events
  window w as (partition by user_id order by ts, event_id)),
ses as (
  select user_id, ts, event_id, event_type,
         sum(new_session) over (partition by user_id
                                order by ts, event_id
                                rows unbounded preceding) as sid
  from ordered),
p as (select string_agg(event_type, '>' order by ts, event_id) as path
      from ses group by user_id, sid)
select path, count(*)::bigint as n from p group by path
order by n desc, path asc limit {SESSION_PATH_TOP_K}
"""

ORACLES["event_anomaly"] = """
with h as (select epoch_us(ts) // 3600000000 as hour,
                  count(*)::bigint as n
           from events group by 1),
m as (select median(n::double) as med from h),
d as (select median(abs(h.n::double - m.med)) as mad from h, m)
select h.hour, h.n,
       (case when abs(h.n::double - m.med) > 3 * d.mad
             then 1 else 0 end)::bigint as is_outlier
from h, m, d
"""

ORACLES["audience_overlap"] = """
with ut as (select distinct user_id, event_type from events),
tot as (select event_type, count(*)::bigint as nu from ut
        group by event_type),
pairs as (
  select a.event_type as type_a, b.event_type as type_b,
         count(*)::bigint as n_both
  from ut a join ut b
    on a.user_id = b.user_id and a.event_type < b.event_type
  group by 1, 2)
select p.type_a, p.type_b, p.n_both,
       round(p.n_both::double
             / (ta.nu + tb.nu - p.n_both)::double, 6) as jaccard
from pairs p
join tot ta on ta.event_type = p.type_a
join tot tb on tb.event_type = p.type_b
"""

ORACLES["corpus_kl"] = f"""
with t as (select source, unnest(string_split(text, ' ')) as term
           from documents),
tt as (select source, term from t where term <> ''),
c as (select term, count(*)::bigint as n from tt group by term),
top as (select term from (select term, n from c
                          order by n desc, term asc
                          limit {CORPUS_KL_TOP_K})),
st as (select source, term, count(*)::bigint as n
       from tt join top using (term) group by 1, 2),
srcs as (select distinct source from st),
grid as (select s.source, p.term from srcs s cross join top p),
fl as (select g.source, g.term, coalesce(st.n, 0) as n
       from grid g left join st
         on st.source = g.source and st.term = g.term),
tot as (select source, sum(n)::bigint as ns from fl group by source),
gl as (select term, sum(n)::bigint as gn from fl group by term),
gt as (select sum(n)::bigint as nn from fl),
kk as (select count(*)::bigint as k from top)
select f.source,
       round(sum(((f.n + 1)::double / (tot.ns + kk.k)::double)
                 * ln(((f.n + 1)::double / (tot.ns + kk.k)::double)
                      / ((gl.gn + 1)::double
                         / (gt.nn + kk.k)::double))), 6) as kl
from fl f
join tot using (source)
join gl using (term), gt, kk
group by f.source
"""

ORACLES["zipf_slope"] = f"""
with t as (select unnest(string_split(text, ' ')) as term from documents),
c as (select term, count(*)::bigint as n from t
      where term <> '' group by term),
top as (select n, row_number() over (order by n desc, term asc) as r
        from c order by n desc, term asc limit {ZIPF_TOP_K}),
m as (select count(*)::bigint as k,
             sum(ln(r::double)) as sx, sum(ln(n::double)) as sy,
             sum(ln(r::double) * ln(r::double)) as sxx,
             sum(ln(r::double) * ln(n::double)) as sxy
      from top)
select k as k_terms,
       case when k * sxx - sx * sx = 0 then 0.0
            else round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
       end as slope
from m
"""


def snapshot_editdist_oracle_sql(a_dir: str, b_dir: str) -> str:
    return f"""
select a.url,
       levenshtein(substr(a.text, 1, {EDITDIST_CAP}),
                   substr(b.text, 1, {EDITDIST_CAP}))::bigint as editdist
from read_parquet('{a_dir}/*.parquet') a
join read_parquet('{b_dir}/*.parquet') b using (url)
"""


ORACLES["join_storage_bucketed"] = (
    "select o_orderpriority, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue, "
    "count(*) as n_lineitems from orders join lineitem "
    "on o_orderkey = l_orderkey group by o_orderpriority"
)

ORACLES["agg_incremental"] = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_revenue,
       round(sum(l_discount) / count(*), 6) as avg_disc,
       count(*) as n
from lineitem group by l_returnflag, l_linestatus
"""

ORACLES["domain_entropy"] = """
with c as (select source, count(*)::bigint as n from documents
           group by source),
t as (select sum(n)::bigint as nn from c)
select count(*)::bigint as n_sources,
       round(ln(nn::double)
             - sum(n::double * ln(n::double)) / nn::double, 6)
         as entropy_nats,
       round(max(n)::double / nn::double, 6) as top_share
from c, t group by nn
"""

ORACLES["event_transitions"] = """
with w as (
  select user_id, event_type,
         lag(event_type) over (
           partition by user_id order by ts, event_id) as prev_type
  from events)
select prev_type, event_type as next_type, count(*)::bigint as n
from w where prev_type is not null
group by 1, 2
"""

ORACLES["embed_standardize"] = """
with flat as (
  select vec_id, unnest(embedding)::double as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings),
s as (
  select pos, avg(val) as m,
         sqrt(greatest(avg(val * val) - avg(val) * avg(val), 0)) as sd
  from flat group by pos)
select f.vec_id, f.pos::bigint as pos,
       case when s.sd = 0 then 0.0
            else round((f.val - s.m) / s.sd, 6) end as z
from flat f join s using (pos)
"""

ORACLES["embed_covariance"] = """
with flat as (
  select vec_id, unnest(embedding)::double as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings)
select a.pos::bigint as i, b.pos::bigint as j,
       round(sum(a.val * b.val) / count(*) - avg(a.val) * avg(b.val), 6)
         as cov
from flat a join flat b using (vec_id)
where a.pos <= b.pos
group by 1, 2
"""


def _shingle_cte_body(source: str = "documents") -> str:
    """(doc_id, distinct 3-token shingle list) CTE chain, same tokenizer
    and shingle construction as ``_minhash_cte_body`` without the
    minhash/band tail."""
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
toks as (
  select doc_id, {tokenize} as toks from {source}),
sh as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
sd as (select doc_id, list_distinct(shingles) as s from sh)
"""


ORACLES["copy_search"] = f"""
with {_shingle_cte_body()},
q as (select doc_id as qid, s as qs from sd
      where doc_id = (select min(doc_id) from documents))
select d.doc_id, len(list_intersect(d.s, q.qs))::bigint as n_common,
       len(q.qs)::bigint as n_query
from sd d cross join q
where d.doc_id <> q.qid
order by n_common desc, d.doc_id asc
limit {COPY_SEARCH_K}
"""

ORACLES["signal_correlation"] = f"""
with sig as (
  select length(text)::bigint as c,
         length(regexp_extract_all(text, '\\S+'))::bigint as t,
         len(list_distinct({dd.SQL_TOKENIZE.format(col="text")}))::bigint as l
  from documents),
m as (
  select count(*)::hugeint as n,
         sum(c)::hugeint as sc, sum(t)::hugeint as st, sum(l)::hugeint as sl,
         sum(c*c)::hugeint as scc, sum(t*t)::hugeint as stt,
         sum(l*l)::hugeint as sll, sum(c*t)::hugeint as sct,
         sum(c*l)::hugeint as scl, sum(t*l)::hugeint as stl
  from sig)
select * from (
  select 'chars' as sig_a, 'tokens' as sig_b,
         case when n*scc - sc*sc = 0 or n*stt - st*st = 0 then 0.0
              else round((n*sct - sc*st)::double /
                         (sqrt((n*scc - sc*sc)::double) *
                          sqrt((n*stt - st*st)::double)), 6) end as corr
  from m
  union all
  select 'chars', 'types',
         case when n*scc - sc*sc = 0 or n*sll - sl*sl = 0 then 0.0
              else round((n*scl - sc*sl)::double /
                         (sqrt((n*scc - sc*sc)::double) *
                          sqrt((n*sll - sl*sl)::double)), 6) end
  from m
  union all
  select 'tokens', 'types',
         case when n*stt - st*st = 0 or n*sll - sl*sl = 0 then 0.0
              else round((n*stl - st*sl)::double /
                         (sqrt((n*stt - st*st)::double) *
                          sqrt((n*sll - sl*sl)::double)), 6) end
  from m)
"""


# Oracles whose SQL embeds literals derived from the GRAFT_ORACLE_SF_DIR
# fixture tables; all_oracles() can only compose them when that dir
# exists. The registry guard (tests/test_registry.py) subtracts this set
# when the fixture dir is absent so the consistency test is portable.
ENV_CONDITIONAL_ORACLES = frozenset(
    {
        "csv_roundtrip",
        "rowgroup_prune",
        "knn_ivf",
        "embed_pca",
        "knn_lsh",
        "ann_recall",
        "dedup_semantic",
        "embed_pq",
    }
)


def all_oracles() -> dict[str, str]:
    """ORACLES plus the lazily-composed entries (the flagship oracle
    writes its fixture corpus on first call, so it is not built at module
    import)."""
    out = dict(ORACLES)
    out["split_assign"] = SPLIT_ASSIGN_SQL
    out["embed_matryoshka"] = EMBED_MATRYOSHKA_SQL
    out["event_stationary"] = event_stationary_oracle_sql()
    out["event_entropy"] = event_entropy_oracle_sql()
    out["user_survival_curve"] = USER_SURVIVAL_SQL
    out["event_cusum"] = EVENT_CUSUM_SQL
    out["coverage_sample"] = coverage_oracle_sql()
    out["l_diversity"] = L_DIVERSITY_SQL
    out["event_gaps_hist"] = EVENT_GAPS_HIST_SQL
    out["domain_gini"] = DOMAIN_GINI_SQL
    out["ab_lift"] = AB_LIFT_SQL
    out["markov_perplexity"] = markov_perplexity_oracle_sql()
    sf_for_csv = os.environ.get(
        "GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if os.path.isfile(_pq(sf_for_csv, "documents")):
        out["csv_roundtrip"] = csv_roundtrip_oracle_sql(
            csv_corpus(sf_for_csv)
        )
        out["rowgroup_prune"] = rowgroup_prune_oracle_sql(
            rowgroup_corpus(sf_for_csv)
        )
    out["approx_distinct_hll"] = _hll_oracle_sql()
    out["skew_f2"] = skew_f2_oracle_sql()
    out["bm25_search"] = bm25_oracle_sql()
    out["embedding_outliers"] = EMBEDDING_OUTLIERS_SQL
    out["dsir_weights"] = DSIR_WEIGHTS_SQL
    out["top_terms_by_lang"] = TOP_TERMS_BY_LANG_SQL
    out["warc_roundtrip"] = warc_oracle_sql(warc_corpus()[1])
    out["cdx_index"] = cdx_oracle_sql(warc_corpus()[1])
    out["warc_fetch"] = warc_fetch_oracle_sql(warc_corpus()[1])
    out["bloom_dedup"] = BLOOM_DEDUP_SQL
    out["ccnet_buckets"] = ccnet_oracle_sql()
    out["bpe_pairs"] = BPE_PAIRS_SQL
    out["bpe_train"] = bpe_train_oracle_sql()
    out["bpe_encode"] = bpe_encode_oracle_sql()
    out["extract_synthetic"] = _flagship_oracle_sql()
    out["extract_grid_cards"] = _card_oracle_sql()
    link_dir = link_corpus()  # idempotent fixture write
    out["outlinks"] = outlinks_oracle_sql(link_dir)
    out["link_indegree"] = indegree_oracle_sql(link_dir)
    out["pagerank"] = pagerank_oracle_sql(link_dir)
    out["trustrank"] = trustrank_oracle_sql(link_dir)
    out["hits_rank"] = hits_oracle_sql(link_dir)
    out["link_components"] = link_components_oracle_sql(link_dir)
    out["graph_triangles"] = triangles_oracle_sql(link_dir)
    out["graph_assortativity"] = assortativity_oracle_sql(link_dir)
    out["label_prop"] = label_prop_oracle_sql(link_dir)
    out["weekday_seasonality"] = WEEKDAY_SEASONALITY_SQL
    out["attribution_delay"] = ATTRIBUTION_DELAY_SQL
    out["event_burstiness"] = EVENT_BURSTINESS_SQL
    out["crawl_budget"] = CRAWL_BUDGET_SQL
    out["length_lognormal"] = LENGTH_LOGNORMAL_SQL
    out["user_features"] = USER_FEATURES_SQL
    out["link_kcore"] = kcore_oracle_sql(link_dir)
    out["link_distance"] = linkdist_oracle_sql(link_dir)
    out["degree_distribution"] = degree_distribution_oracle_sql(link_dir)
    out["url_history"] = url_history_oracle_sql(recrawl_corpus())
    out["temporal_novelty"] = temporal_novelty_oracle_sql(recrawl_corpus())
    out["first_seen"] = first_seen_oracle_sql(recrawl_corpus())
    out["scd2_intervals"] = scd2_oracle_sql(recrawl_corpus())
    out["url_templates"] = url_templates_oracle_sql(urltrap_corpus())
    struct_dir = struct_corpus()  # idempotent fixture write
    out["pareto_concentration"] = PARETO_SQL
    out["log_odds_terms"] = log_odds_oracle_sql()
    out["ks_test"] = KS_TEST_SQL
    out["caps_ratio"] = CAPS_RATIO_SQL
    out["gap_exponential_fit"] = GAP_EXP_FIT_SQL
    out["cdc_chunk_stats"] = cdc_chunk_stats_oracle_sql()
    out["canonical_extract"] = canonical_extract_oracle_sql(
        struct_corpus())
    out["minhash_calibration"] = minhash_calibration_oracle_sql()
    out["token_quota"] = token_quota_oracle_sql()
    out["outline_depth_stats"] = outline_depth_oracle_sql(struct_corpus())
    out["simhash_idf"] = simhash_idf_oracle_sql()
    out["simhash_hamming_hist"] = (
        "with " + _simhash_cte_body() + _SIMHASH_PAIRS_TAIL
        + "select hamming::bigint as hamming, count(*)::bigint as n_pairs "
          "from spairs where hamming <= 3 group by hamming")
    out["fisher_dims"] = FISHER_SQL
    out["event_trigrams"] = EVENT_TRIGRAMS_SQL
    out["brand_return_rates"] = BRAND_RETURN_SQL
    out["part_supply_risk"] = PART_SUPPLY_RISK_SQL
    out["ship_delay_stats"] = SHIP_DELAY_SQL
    out["centroid_distances"] = centroid_distances_oracle_sql()
    sd_a, sd_b = schema_drift_fixture()
    out["schema_drift"] = schema_drift_oracle_sql(sd_a, sd_b)
    out["seasonal_backtest"] = SEASONAL_BACKTEST_SQL
    out["props_extract"] = PROPS_EXTRACT_SQL
    out["q5_local_supplier"] = Q5_SQL
    out["cluster_chaining_audit"] = (
        _minhash_cte() + CLUSTER_CHAINING_SQL_SUFFIX)
    out["score_reliability"] = score_reliability_oracle_sql()
    out["df_stopwords"] = DF_STOPWORDS_SQL
    out["dup_rate_estimate"] = dup_rate_oracle_sql()
    out["consistent_hash_assign"] = CONSISTENT_HASH_SQL
    out["span_intervals"] = span_intervals_oracle_sql()
    out["partitioned_write_roundtrip"] = PARTITIONED_WRITE_SQL
    out["match_spans"] = match_spans_oracle_sql()
    out["merge_upserts"] = MERGE_UPSERTS_SQL
    out["wau_rolling"] = WAU_ROLLING_SQL
    out["hll_cumulative"] = hll_cumulative_oracle_sql()
    out["domain_pagerank"] = domain_pagerank_oracle_sql(link_corpus())
    out["graph_negative_edges"] = graph_negative_edges_oracle_sql(
        link_corpus())
    out["score_calibrate"] = SCORE_CALIBRATE_SQL
    out["equidepth_bins"] = EQUIDEPTH_SQL
    out["join_bloom_prefilter"] = JOIN_BLOOM_SQL
    out["entity_clusters"] = entity_clusters_oracle_sql(er_corpus())
    out["html_to_markdown"] = html_to_markdown_oracle_sql(struct_dir)
    out["t_closeness"] = T_CLOSENESS_SQL
    out["shard_plan"] = SHARD_PLAN_SQL
    out["date_extract"] = date_extract_oracle_sql(struct_dir)
    out["jsonld_extract"] = jsonld_extract_oracle_sql(struct_dir)
    out["contrastive_pairs"] = CONTRASTIVE_SQL.format(NQ=N_QUERIES)
    out["heading_outline"] = heading_outline_oracle_sql(struct_dir)
    out["html_tables"] = html_tables_oracle_sql(struct_dir)
    out["rank_fusion"] = rank_fusion_oracle_sql()
    out["join_outer"] = JOIN_OUTER_SQL
    out["freq_itemsets"] = FREQ_ITEMSETS_SQL
    out["approx_quantiles"] = APPROX_QUANTILES_SQL
    er_dir = er_corpus()  # idempotent fixture write
    out["entity_resolve"] = entity_resolve_oracle_sql(er_dir)
    out["snm_pairs"] = snm_pairs_oracle_sql(er_dir)
    out["build_postings"] = BUILD_POSTINGS_SQL
    out["link_density"] = link_density_oracle_sql(link_corpus())
    out["snapshot_asof"] = snapshot_asof_oracle_sql(recrawl_corpus())
    out["crawl_schedule"] = crawl_schedule_oracle_sql(link_corpus())
    out["quality_composite"] = QUALITY_COMPOSITE_SQL.format(
        QSCORE=ORACLES["quality_score"]
    )
    pii_dir = pii_corpus()  # idempotent fixture write
    out["pii_scan"] = pii_scan_oracle_sql(pii_dir)
    out["pii_scrub"] = pii_scrub_oracle_sql(pii_dir)
    out["pii_gate"] = pii_gate_oracle_sql(pii_dir)
    out["bitext_mine"] = BITEXT_ORACLE_SQL
    out["leakage_free_split"] = leakage_free_split_oracle_sql()
    out["cocitation"] = cocitation_oracle_sql(link_dir)
    out["reciprocal_links"] = reciprocal_oracle_sql(link_dir)
    out["anchor_text"] = anchor_text_oracle_sql(link_dir)
    out["external_link_ratio"] = external_link_ratio_oracle_sql(link_dir)
    out["crawl_frontier"] = crawl_frontier_oracle_sql(link_dir)
    out["html_meta"] = html_meta_oracle_sql(link_dir)
    out["dom_templates"] = dom_templates_oracle_sql(link_dir)
    out["snapshot_latest"] = snapshot_latest_oracle_sql(recrawl_corpus())
    a_dir, b_dir = crawl_diff_corpus()
    out["snapshot_diff"] = snapshot_diff_oracle_sql(a_dir, b_dir)
    out["snapshot_editdist"] = snapshot_editdist_oracle_sql(a_dir, b_dir)
    out["snapshot_incremental"] = f"""
with d as ({snapshot_diff_oracle_sql(a_dir, b_dir)})
select d.url, d.status, b.text
from d join read_parquet('{b_dir}/*.parquet') b using (url)
where d.status in ('new', 'changed')
"""
    out["jsonl_roundtrip"] = f"""
select url, lang, score::bigint as score,
       length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens
from read_json_auto('{jsonl_corpus()}', format='newline_delimited')
"""
    # knn_ivf's oracle embeds data-dependent centroid literals, so it is
    # composed against the driver's gate tables (sf0.01); the per-sf form
    # is pytest-verified at every sf in tests/test_knn_ivf_oracle.py
    ivf_sf = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    if os.path.isfile(_pq(ivf_sf, "embeddings")):
        out["knn_ivf"] = ivf_oracle_sql(ivf_sf)
        # embed_pca's eigenvector/mean literals are data-dependent in
        # the same way (recomputed independently from the raw parquet)
        out["embed_pca"] = pca_oracle_sql(ivf_sf)
        # knn_lsh's plane literals depend only on the embedding DIMENSION
        # (data-independent), read from the same gate tables
        out["knn_lsh"] = lsh_oracle_sql(ivf_sf)
        out["ann_recall"] = ann_recall_oracle_sql(ivf_sf)
        # dedup_semantic shares knn_ivf's data-dependent centroid literals
        out["dedup_semantic"] = semdedup_oracle_sql(ivf_sf)
        # embed_pq's subspace codebooks follow the same contract
        out["embed_pq"] = pq_oracle_sql(ivf_sf)
    return out
