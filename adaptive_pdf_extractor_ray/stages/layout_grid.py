"""Layout-grid PDF extraction stage (actor pool).

The detached-header card layouts of the reference's REAL corpus
(`data/real/*.pdf`) render labels and values on different lines, grouped
by x-column — invisible to the linear text path; the reference handles
them with an LLM. This stage extracts them deterministically:
``parse_pdf_runs`` (positional text runs) + ``functions/layout.py``
grid/inline/enum/headline rules, as a callable-class ``map_batches``
stage (labels folded and templates prepared once per actor).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.layout import grid_extract
from ..sources.pdfio import PdfError, parse_pdf_runs


class GridPdfExtract:
    """(url, html) -> (url, extracted_json, error): per-row fault
    isolation like the text path; non-PDF / unparseable rows land in
    ``error``, never fail the task."""

    def __init__(
        self,
        labels: dict[str, str],
        enums: dict[str, list[str]] | None = None,
        headline_field: str | None = None,
    ):
        self.labels = dict(labels)
        self.enums = {k: list(v) for k, v in (enums or {}).items()}
        self.headline = headline_field

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_json: list[str | None] = []
        errs: list[str | None] = []
        for payload in batch["html"].to_pylist():
            try:
                runs = parse_pdf_runs(bytes(payload or b""))
                ans = grid_extract(
                    runs, self.labels, enums=self.enums,
                    headline_field=self.headline,
                )
                out_json.append(
                    json.dumps(ans, ensure_ascii=False, sort_keys=True)
                )
                errs.append(None)
            except (PdfError, ValueError, TypeError) as e:
                out_json.append(None)
                errs.append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "url": batch["url"],
                "extracted_json": pa.array(out_json, pa.string()),
                "error": pa.array(errs, pa.string()),
            }
        )
