"""Multimodal stub plumbing: image/audio binary columns, decode/feature actor stages, phash.

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
    _read,
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




FLAGSHIP_N = 2000
