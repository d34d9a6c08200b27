"""Distributed top-K without a global sort.

A global ``Dataset.sort`` is an all-to-all range shuffle of every block —
the wrong shape when only K rows survive. ``dataset_topk`` keeps at most
K rows per block (vectorized ``pyarrow.compute.sort_indices`` + take),
then reduces the K x num_blocks survivors in one tiny final partition:
the network moves O(K x blocks) rows instead of the dataset. Same
partial/final shape as ``stages/similarity.py`` kNN top-k.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def dataset_topk(ds, sort_keys: list[tuple[str, str]], k: int):
    """Exact top-K rows of ``ds`` under ``sort_keys`` (pyarrow
    ``sort_indices`` key format: (column, 'ascending'|'descending')).
    Correct because global top-K is a subset of the union of per-block
    top-Ks."""

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx.slice(0, k))

    def final(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx.slice(0, k))

    return (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )
