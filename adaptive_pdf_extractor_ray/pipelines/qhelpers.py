"""Shared helpers: parquet IO, row counts, actor-pool sizing, relocated cross-family constants.

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


def adaptive_partitions_docs(sf_dir: str) -> int:
    """Shuffle partition count sized to the documents table (parquet
    metadata row count — no data read)."""
    from ..stages.dedup import adaptive_partitions

    return adaptive_partitions(_table_rows(sf_dir, "documents"))


# broadcast-join routing threshold: above this the "small" side is not a
# bounded dimension any more (a dict of 5M (int, short-string) pairs is a
# few hundred MB in every actor — the ceiling of sane broadcast) and the
# plan switches to the hash-partitioned Dataset.join
BROADCAST_MAX_ROWS = 5_000_000
DAY_US = 86_400_000_000


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


CRAWL_DELAY_S = 5  # per-host politeness delay between fetches
