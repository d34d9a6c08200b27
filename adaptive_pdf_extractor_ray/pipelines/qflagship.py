"""Adaptive-extraction flagship entries over the synthetic CC-style corpus.

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
    _apool,
)
from .qmedia import (  # noqa: F401
    FLAGSHIP_N,
)



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
