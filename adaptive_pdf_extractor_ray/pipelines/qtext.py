"""Extraction-core + text-analysis operators (normalize, pages roundtrip, rule extract, fingerprints).

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
    MARKERS, _read,
)





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
