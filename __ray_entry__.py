"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship adaptive-extraction pipeline over pages
synthesized deterministically from ``/root/testdata/sf0.001/documents``
(text / HTML / PDF ingest modes) and returns the answers Dataset.
``queries()`` exposes every implemented operator/pipeline (SURVEY.md §2 +
the training-data family); ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each SQL-expressible entry.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents -> pages
    (text/HTML/PDF) -> parse -> normalize -> fingerprint -> rule apply."""
    import tempfile

    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
    from adaptive_pdf_extractor_ray.sources.synthetic import write_corpus

    cache_root = tempfile.gettempdir() + "/aper_entry_corpus"
    pages_dir, _ = write_corpus(cache_root, n=600, seed=1, shard_rows=200)
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    work = tempfile.mkdtemp(prefix="aper_entry_")
    res = extract_pages(
        rd.read_parquet(pages_dir), work, write_answers=False,
        concurrency=max(1, min(8, n_cpus - 2)), batch_size=1024,
    )
    return res["answers"].select_columns(
        ["url", "fingerprint", "extracted_json", "spans_json", "text_norm",
         "n_missing", "error"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from adaptive_pdf_extractor_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL equivalents (same column names, same rounding)."""
    from adaptive_pdf_extractor_ray.pipelines.queries import all_oracles

    return all_oracles()
