"""Decontamination, repetition-quality, quantiles, global rank.

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
    _apool, _read,
)




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



LINK_N = 200
LINK_HREF_RE = re.compile(r'href="([^"]*)"')
PR_ITERS = 5
