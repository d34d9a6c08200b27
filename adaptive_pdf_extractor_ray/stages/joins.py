"""Skew-aware distributed joins.

A native hash-partitioned join sends every row of a key to ONE
aggregator; a web-scale hot key (the empty-referrer domain, the
boilerplate fingerprint, user_id 0) turns that partition into the job's
straggler. ``salted_join`` splits the key space explicitly:

- hot keys: the fat (left) side is SALTED — each row joins under
  ``(key, md5(salt_col) % salt)`` so one key fans out over ``salt``
  partitions; the thin (right) side is REPLICATED ``salt`` ways, one
  copy per salt value.
- cold keys: salt 0 on both sides — exactly the plain join.

Both halves then run as ONE uniform ``(key, salt)`` hash join (no
union, no second plan). The salt is derived from md5 of a caller-named
column, not an RNG — deterministic across retries/resume, the repo-wide
idiom (sample_reservoir, split_assign). Replication cost is
``salt × |right ∩ hot|`` rows, the textbook trade for removing an
unbounded straggler; the hot set is tiny by construction (detected or
caller-pinned), so the blow-up is bounded.

Value parity with the plain join is pinned by
``tests/test_salted_join.py`` (bit-identical result sets on skewed
fixtures) and by the ``join_skewed`` driver oracle (plain SQL join).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def detect_hot_keys(
    ds: rd.Dataset, key: str, *, threshold_share_ppm: int = 50_000,
    max_hot: int = 64,
) -> list:
    """One counter pass over ``ds[key]`` (per-batch partials, then a
    keys-sized groupby — rows never move) returning keys holding more
    than ``threshold_share_ppm`` of the rows, capped at the ``max_hot``
    heaviest. The cap bounds replication cost; anything below ~5% of
    the corpus doesn't straggle a partition in the first place."""

    def partials(t: pa.Table) -> pa.Table:
        part = t.select([key]).group_by(key).aggregate([([], "count_all")])
        return part.rename_columns([key, "n"])

    counts = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .materialize()
    )
    total = int(counts.sum("n") or 0)
    if not total:
        return []
    cut = total * threshold_share_ppm // 1_000_000
    from .topk import dataset_topk

    top = dataset_topk(
        counts, [("n", "descending"), (key, "ascending")], max_hot
    ).take_all()
    return [r[key] for r in top if int(r["n"]) > cut]


def salted_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    salt_col: str,
    hot_keys: list,
    salt: int = 8,
    num_partitions: int = 8,
    join_type: str = "inner",
) -> rd.Dataset:
    """Join ``left`` (fat, skewed on ``on``) with ``right`` (thin per
    key) with hot keys fanned out over ``salt`` sub-partitions. Output
    columns: left columns + right non-key columns (``_r``-suffixed on
    collision), salt/key bookkeeping dropped — same surface as the
    plain join."""
    right_on = right_on or on
    hot = set(hot_keys)
    if not hot or salt <= 1:
        return left.join(
            right, join_type=join_type, num_partitions=num_partitions,
            on=(on,), right_on=(right_on,), right_suffix="_r",
        )

    def salt_left(t: pa.Table) -> pa.Table:
        keys = t[on].to_pylist()
        sc = t[salt_col].to_pylist()
        salts = [
            int(hashlib.md5(str(s).encode("utf-8")).hexdigest()[:8], 16)
            % salt
            if k in hot
            else 0
            for k, s in zip(keys, sc)
        ]
        return t.append_column("_salt", pa.array(salts, pa.int64()))

    def replicate_right(t: pa.Table) -> pa.Table:
        keys = t[right_on].to_pylist()
        idx, salts = [], []
        for i, k in enumerate(keys):
            if k in hot:
                idx.extend([i] * salt)
                salts.extend(range(salt))
            else:
                idx.append(i)
                salts.append(0)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("_salt", pa.array(salts, pa.int64()))

    lj = left.map_batches(
        salt_left, batch_format="pyarrow", zero_copy_batch=True
    )
    rj = right.map_batches(
        replicate_right, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = lj.join(
        rj, join_type=join_type, num_partitions=num_partitions,
        on=(on, "_salt"), right_on=(right_on, "_salt"), right_suffix="_r",
    )
    drop = [c for c in ("_salt", "_salt_r") if c in joined.schema().names]
    return joined.drop_columns(drop) if drop else joined
