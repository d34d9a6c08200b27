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

This module also owns the repo-wide guard against the
EMPTY-PARTITION SCHEMA-LOSS class (rounds 2 and 4 both hit it):
Ray's sort / groupby().aggregate() / groupby().map_groups() emit a
ZERO-COLUMN ``(0 rows, 0 cols)`` block for EVERY empty partition —
not just over fully-empty input; a sparse key space over many
partitions leaves degenerate blocks inside perfectly nonempty
datasets. Whether one of them wins a downstream operator's schema
resolution is block-order-dependent, so a hash-shuffle
``Dataset.join`` fed by such a chain fails nondeterministically with
``ArrowInvalid: No match ... FieldRef.Name(k) on left side``
(reproduced deterministically in ``tests/test_safe_join.py``; a
``map_batches`` cannot repair it — Ray passes empty blocks through
without calling the UDF). ``drop_degenerate_blocks`` removes them at
the block-ref level; ``schema_guard`` additionally casts to a declared
Arrow schema; ``safe_join`` size-routes small joins to a broadcast
map_batches path (no shuffle at all → hazard structurally impossible)
and degenerate-drops both sides of the distributed fallback.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


# Below this many rows on the small (right) side, safe_join broadcasts
# the right table via ray.put and joins per-batch with pyarrow — no hash
# shuffle, so the empty-partition schema-loss hazard cannot arise and a
# tiny join costs zero aggregator-actor spinup. Same routing constant
# family as dedup.PAIR_BROADCAST_MAX / queries.BROADCAST_MAX_ROWS.
BROADCAST_JOIN_MAX = 100_000


def schema_guard(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Pin ``ds``'s blocks to ``schema``, removing the degenerate
    zero-column empty blocks that sort / groupby aggregate / map_groups
    emit over empty input.

    A ``map_batches`` CANNOT do this: Ray passes empty blocks through
    without ever calling the UDF (verified empirically — see
    ``tests/test_safe_join.py``), so the only reliable guard is at the
    block level: materialize, keep only the refs of blocks with rows
    (``num_rows`` comes from metadata — no block is fetched to the
    driver), rebuild via ``from_arrow_refs``, then a fused select+cast
    pass to close int32/int64 drift. Empty input becomes one typed
    empty block. Only hash-shuffle ``join`` chokes on degenerate blocks
    (select_columns / filter / groupby / sort / union all tolerate
    them), so this guard belongs at join inputs — and only on sides
    small enough that materializing is free, which is exactly the
    near-empty case that produces the hazard."""
    m = ds.materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        # return the typed empty directly — wrapping it in map_batches
        # would lose the schema again (the UDF never runs on empties)
        return rd.from_arrow(schema.empty_table())
    out = rd.from_arrow_refs(refs)

    def _pin(t: pa.Table) -> pa.Table:
        if t.schema == schema:
            return t
        return t.select(schema.names).cast(schema)

    return out.map_batches(_pin, batch_format="pyarrow", zero_copy_batch=True)


def drop_degenerate_blocks(
    ds: rd.Dataset, schema: pa.Schema | None = None
) -> rd.Dataset:
    """Materialize ``ds`` and drop its zero-ROW blocks at the ref level
    (``meta.num_rows`` — no block travels to the driver; the kept refs
    stay distributed in plasma via ``from_arrow_refs``). Removing all
    empty blocks removes every zero-COLUMN degenerate, which is the
    whole point. Fully-empty input becomes one typed empty block when
    ``schema`` is given, else it is returned as-is (caller guards).

    Cost note for joins: a hash-shuffle join is already a barrier (its
    aggregators consume all input before finalize), so materializing a
    join input here does not reduce pipelining — it only adds object
    -store residency, which the shuffle would consume anyway."""
    m = ds.materialize()
    refs = [
        ref
        for bundle in m.iter_internal_ref_bundles()
        for ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if refs:
        return rd.from_arrow_refs(refs)
    if schema is not None:
        return rd.from_arrow(schema.empty_table())
    return m


def collect_table(ds: rd.Dataset, schema: pa.Schema | None = None) -> pa.Table:
    """Driver-side concat of a SMALL dataset into one Arrow table,
    skipping degenerate zero-column blocks. ``schema`` types the result
    when every block is empty (otherwise the first real block's schema
    wins). Only for broadcast sides already counted small."""
    tables = [
        t for t in ds.iter_batches(batch_format="pyarrow")
        if t.num_columns > 0
    ]
    if not tables:
        if schema is None:
            sch = ds.schema(fetch_if_missing=True)
            if sch is None:  # every block degenerate: untypeable
                raise ValueError(
                    "collect_table: dataset is empty and untyped; pass "
                    "an explicit schema (safe_join: right_schema)"
                )
            schema = pa.schema(
                [pa.field(n, t_) for n, t_ in zip(sch.names, sch.types)]
            )
        return schema.empty_table()
    if schema is not None:
        tables = [t.select(schema.names).cast(schema) for t in tables]
    return pa.concat_tables(tables, promote_options="permissive")


_PA_JOIN_TYPE = {
    "inner": "inner",
    "left_outer": "left outer",
    "left_anti": "left anti",
}


def safe_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on,
    right_on=None,
    join_type: str = "inner",
    num_partitions: int | None = None,
    right_suffix: str = "_r",
    broadcast_max: int = BROADCAST_JOIN_MAX,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Empty-partition-safe ``Dataset.join`` (same output surface:
    left columns + right non-key columns, collisions ``right_suffix``-ed,
    right key columns dropped).

    Routing: the right side is materialized and counted (callers pass
    the side expected smaller as ``right``). At or under
    ``broadcast_max`` rows — the overwhelmingly common case for the
    pair/edge/audit joins that have twice tripped the schema-loss flake
    — the right table ships once via ``ray.put`` and each left batch
    joins against it with pyarrow locally: no shuffle, no aggregator
    actors, hazard structurally impossible, and the left side keeps
    streaming. Above it, a distributed hash join with data-adaptive
    partitions (>=100k rows each, so no partition is near-empty), with
    both inputs ``schema_guard``-pinned when schemas are known.

    ``left_schema`` declares a risky left — one flowing out of a
    groupby / sort / map_groups chain, whose blocks can include
    zero-column degenerates. safe_join then block-pins it up front
    (materializing it, which costs no pipelining since a hash join is a
    barrier) and guarantees a degenerate-free, schema-stable output in
    both routes. A map_batches / read chain left is always typed — omit
    the schema and it keeps streaming untouched."""
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (
        on if right_on is None
        else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    )
    # Guard a declared-risky left BEFORE routing: empty blocks skip
    # map_batches UDFs entirely, so the broadcast route would otherwise
    # pass an input degenerate through into its own output.
    if left_schema is not None:
        left = schema_guard(left, left_schema)
    right = right.materialize()
    n_right = right.count()

    if n_right <= broadcast_max and join_type in _PA_JOIN_TYPE:
        rt = collect_table(right, right_schema)
        rt_ref = ray.put(rt)
        pa_join = _PA_JOIN_TYPE[join_type]
        keys, rkeys = list(on), list(right_on)

        def _bjoin(t: pa.Table) -> pa.Table:
            r = ray.get(rt_ref)
            if t.num_columns == 0:
                if left_schema is not None:
                    t = left_schema.empty_table()
                else:  # type keys from the right side; 0 rows out anyway
                    t = pa.table(
                        {k: pa.array([], r.schema.field(rk).type)
                         for k, rk in zip(keys, rkeys)}
                    )
            return t.join(
                r, keys=keys, right_keys=rkeys, join_type=pa_join,
                right_suffix=right_suffix,
            )

        return left.map_batches(
            _bjoin, batch_format="pyarrow", zero_copy_batch=True
        )

    # Distributed route: sparse upstream sort/groupby/map_groups
    # partitions leave zero-column degenerate blocks in NONEMPTY
    # datasets too (see module docstring) — whether one wins the join's
    # schema resolution is a race. The right side is already
    # materialized for the count, so dropping its degenerates is pure
    # ref filtering — always done. The left keeps STREAMING by default
    # (a map_batches/read chain is always typed and needs no guard);
    # ``left_schema`` (guarded above) materializes it, which costs no
    # pipelining since a hash join is a barrier anyway.
    right = (
        schema_guard(right, right_schema)
        if right_schema is not None
        else drop_degenerate_blocks(right)
    )
    from .dedup import adaptive_partitions

    parts = num_partitions or adaptive_partitions(n_right)
    return left.join(
        right, join_type=join_type, num_partitions=parts,
        on=on, right_on=right_on, right_suffix=right_suffix,
    )


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
