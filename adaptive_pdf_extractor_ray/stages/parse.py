"""Parse + normalize + fingerprint stages (stateless map_batches).

Mirrors ``process_dataset`` (``/root/reference/src/data.py:124-173``): use
pre-extracted ``text`` when present (the reference's ``pdf_text`` branch),
else parse the ``html`` binary column — ``%PDF-`` magic selects the PDF
layout parser, anything else the HTML boilerplate stripper. Per-row errors
go to an ``error`` column instead of failing the task (row-level fault
isolation vs the reference's raise at ``src/data.py:153-155``).

The heavy ``html`` binary column is projected away by this stage — blocks
stay narrow downstream (url, text_norm, fingerprint, ...).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.templates import fingerprint_text
from ..functions.textnorm import normalize_text_array
from ..sources.htmlio import extract_main_text
from ..sources.pdfio import PDF_MAGIC, parse_pdf_text


def parse_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, html, text, lang) -> (url, warc_ts, lang, raw_text, kind, error)."""
    texts = batch["text"].to_pylist()
    htmls = batch["html"].to_pylist() if "html" in batch.column_names else [None] * len(batch)
    raw: list[str | None] = []
    kind: list[str] = []
    err: list[str | None] = []
    for t, h in zip(texts, htmls):
        try:
            if t is not None:
                raw.append(t)
                kind.append("text")
            elif h is not None:
                if bytes(h[: len(PDF_MAGIC)]) == PDF_MAGIC:
                    raw.append(parse_pdf_text(h))
                    kind.append("pdf")
                else:
                    doc = bytes(h).decode("utf-8", errors="replace")
                    # payloads that are mostly undecodable are opaque media,
                    # not markup — classify honestly, extract nothing
                    if doc and doc.count("�") / len(doc) > 0.10:
                        raw.append(None)
                        kind.append("binary")
                    else:
                        raw.append(extract_main_text(doc))
                        kind.append("html")
            else:
                raw.append(None)
                kind.append("empty")
            err.append(None)
        except Exception as e:  # row-level fault isolation
            raw.append(None)
            kind.append("error")
            err.append(f"{type(e).__name__}: {e}")
    cols = {
        "url": batch["url"],
        "warc_ts": batch["warc_ts"],
        "lang": batch["lang"],
        "raw_text": pa.array(raw, pa.string()),
        "kind": pa.array(kind, pa.string()),
        "error": pa.array(err, pa.string()),
    }
    if "schema_fields" in batch.column_names:  # per-record extraction target
        cols["schema_fields"] = batch["schema_fields"]
    return pa.table(cols)


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Append text_norm (vectorized RE2 kernels); drop raw_text."""
    norm = normalize_text_array(batch["raw_text"])
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    out = batch.append_column("text_norm", norm)
    return out.drop_columns(["raw_text"])


def make_fingerprint_fn(vocab: list[str]):
    """Stateless fingerprint stage (plain function -> elastic tasks).

    The compiled anchor-vocabulary regex lives in a module-level cache
    keyed by the vocab (``templates._VOCAB_RX_CACHE``); Ray worker
    processes persist across tasks, so compilation is amortized exactly
    like actor state — without pinning the fused read->parse->normalize->
    fingerprint chain to an actor pool's concurrency.
    """

    def fingerprint_batch(batch: pa.Table) -> pa.Table:
        fps = [
            fingerprint_text(t, vocab) if t else "unk"
            for t in batch["text_norm"].to_pylist()
        ]
        return batch.append_column("fingerprint", pa.array(fps, pa.string()))

    return fingerprint_batch
