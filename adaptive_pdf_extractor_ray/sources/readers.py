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
        records = json.load(f)

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
    meta = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "label": pa.array(labels, pa.string()),
            "extraction_schema_json": pa.array(schemas, pa.string()),
            "expected_json": pa.array(expected, pa.string()),
        }
    )
    return pages, meta
