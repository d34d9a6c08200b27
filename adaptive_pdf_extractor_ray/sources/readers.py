"""Readers: Parquet pages (canonical) + reference-format JSON ingest.

``read_reference_dataset`` ingests the reference's own dataset layout
(``/root/reference/src/data.py:103-121``: a JSON array of records with
``label``, ``extraction_schema``, and ``pdf_text`` or ``pdf_path``, plus
optional ``expected_answer``) and converts it to the canonical ``pages``
table — so a user of the reference can point this engine at their
existing datasets unchanged. ``pdf_path`` rows load the PDF bytes into
the ``html`` binary column (parsed downstream by the layout parser with
row-level error capture).
"""

from __future__ import annotations

import datetime as _dt
import json
import os

import pyarrow as pa

from .synthetic import EPOCH, PAGES_SCHEMA


def _tolerant_json_load(src: str):
    """JSON with json5-style relaxations, matching the reference's
    ``json5.load`` ingest (``/root/reference/src/data.py:103-121``):
    ``//`` line and ``/* */`` block comments and trailing commas are
    accepted (none inside string literals). Falls back to the installed
    ``json5`` package for anything more exotic, if present."""
    import re

    try:
        return json.loads(src)
    except json.JSONDecodeError:
        pass
    try:  # pragma: no cover - json5 not in this container
        import json5  # type: ignore

        return json5.loads(src)
    except ImportError:
        pass
    # strip comments / trailing commas outside string literals
    out: list[str] = []
    i, n = 0, len(src)
    in_str = False
    while i < n:
        c = src[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(src[i + 1])
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
            out.append(c)
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
            continue
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            i = src.find("*/", i + 2)
            i = n if i < 0 else i + 2
            continue
        else:
            out.append(c)
        i += 1
    cleaned = re.sub(r",(\s*[}\]])", r"\1", "".join(out))
    return json.loads(cleaned)


def schema_vocab(meta: pa.Table) -> list[str]:
    """Anchor labels implied by the per-record ``extraction_schema``s —
    the data-driven vocabulary extension that lets a dataset declare
    fields beyond the built-in template registry
    (reference ``src/data.py:157-168``: the record's schema defines what
    to extract). Pass the union of this and ``default_vocab()`` as
    ``extract_pages(vocab=...)``."""
    from ..functions.templates import default_vocab, field_label

    fields: set[str] = set()
    for s in meta["extraction_schema_json"].to_pylist():
        if s:
            fields.update(json.loads(s))
    labels = {field_label(f) for f in fields} | set(default_vocab())
    return sorted(labels, key=lambda s: (-len(s), s))


def read_reference_dataset(
    json_path: str, data_folder: str | None = None
) -> tuple[pa.Table, pa.Table]:
    """Reference-style JSON -> (pages table, meta table).

    The meta table keeps per-record label / extraction_schema /
    expected_answer (JSON-encoded) keyed by url for evaluation; the pages
    table is the canonical pipeline input.
    """
    data_folder = data_folder or os.path.dirname(json_path)
    with open(json_path, encoding="utf-8") as f:
        records = _tolerant_json_load(f.read())

    urls, htmls, texts = [], [], []
    labels, schemas, expected = [], [], []
    for i, rec in enumerate(records):
        stem = os.path.splitext(os.path.basename(json_path))[0]
        urls.append(f"ref://{stem}/{i}")
        if rec.get("pdf_text") is not None:
            texts.append(rec["pdf_text"])
            htmls.append(None)
        elif rec.get("pdf_path"):
            pdf_file = os.path.join(data_folder, rec["pdf_path"])
            with open(pdf_file, "rb") as pf:
                htmls.append(pf.read())
            texts.append(None)
        else:
            htmls.append(None)
            texts.append(None)
        labels.append(rec.get("label"))
        schemas.append(
            json.dumps(rec.get("extraction_schema", {}), ensure_ascii=False,
                       sort_keys=True)
        )
        exp = rec.get("expected_answer")
        expected.append(
            None if exp is None else json.dumps(exp, ensure_ascii=False,
                                                sort_keys=True)
        )

    n = len(records)
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [EPOCH + _dt.timedelta(seconds=i) for i in range(n)],
                pa.timestamp("us"),
            ),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["pt"] * n, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    # per-record extraction target: the record's schema DEFINES which
    # fields to extract (reference src/data.py:157-168) — carried in the
    # row so the apply stage can honor it without a side lookup
    pages = pages.append_column(
        "schema_fields",
        pa.array(
            [sorted(json.loads(s)) if s else None for s in schemas],
            pa.list_(pa.string()),
        ),
    )
    meta = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "label": pa.array(labels, pa.string()),
            "extraction_schema_json": pa.array(schemas, pa.string()),
            "expected_json": pa.array(expected, pa.string()),
        }
    )
    return pages, meta
