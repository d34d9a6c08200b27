"""Adversarial tests for the empty-partition join schema-loss class
(round-2 `attach_pair_texts`, round-4 `cluster_chaining_audit`).

Root cause, established empirically here: Ray's sort /
groupby().aggregate() / groupby().map_groups() emit a ZERO-COLUMN
``(0 rows, 0 cols)`` block when their input is empty; whether that
degenerate block wins a downstream operator's schema resolution is
block-order-dependent, so a hash-shuffle ``Dataset.join`` fed by such a
chain fails nondeterministically with ``ArrowInvalid: No match ...
FieldRef.Name(k) on left side``. ``map_batches`` CANNOT repair it —
Ray passes empty blocks through without calling the UDF.

These tests (a) pin the failure deterministically (so a Ray upgrade
that fixes it upstream is noticed), (b) prove ``safe_join`` survives
every route on the same poisoned inputs, and (c) drive the join-bearing
audit ops end-to-end over a corpus engineered to produce EMPTY and
RARE (1-edge) pair sets — the exact shapes that minted the flake.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray

from adaptive_pdf_extractor_ray.stages.joins import (
    collect_table,
    safe_join,
    schema_guard,
)

KV = pa.schema([("k", pa.int64()), ("v", pa.int64())])


def _kv(ks, vs):
    return pa.table(
        {"k": pa.array(ks, pa.int64()), "v": pa.array(vs, pa.int64())}
    )


def _right():
    return ray.data.from_arrow(
        pa.table(
            {"k": pa.array([1, 2], pa.int64()),
             "w": pa.array([10, 20], pa.int64())}
        )
    )


def _poisoned_left():
    """Dataset whose FIRST block is the degenerate zero-column empty
    table — the deterministic form of the flake (in the wild the order
    is a race)."""
    return ray.data.from_arrow([pa.table({}), _kv([1, 1, 2], [1, 2, 3])])


class TestHazardPinned:
    def test_plain_join_dies_on_degenerate_first_block(self, ray_session):
        """The raw Ray join MUST fail on the poisoned input — this pins
        the hazard itself. If a Ray upgrade makes this pass, safe_join's
        guards become optional and this test says so loudly."""
        j = _poisoned_left().join(
            _right(), join_type="inner", num_partitions=16, on=("k",)
        )
        with pytest.raises(Exception, match="FieldRef|No match"):
            j.count()

    def test_sort_groupby_mapgroups_emit_zero_column_blocks(
        self, ray_session
    ):
        """The three producers of the degenerate block."""
        base = ray.data.from_arrow(_kv([1, 2], [1, 2])).filter(
            expr="v > 100"
        )
        producers = {
            "sort": base.sort("k"),
            "groupby_agg": base.groupby("k").aggregate(
                ray.data.aggregate.Count(alias_name="n")
            ),
            "map_groups": base.groupby("k").map_groups(
                lambda t: t, batch_format="pyarrow"
            ),
        }
        for name, ds in producers.items():
            blocks = [
                ray.get(ref)
                for b in ds.materialize().iter_internal_ref_bundles()
                for ref, _ in b.blocks
            ]
            assert any(t.num_columns == 0 for t in blocks), (
                f"{name} no longer emits zero-column empties — "
                "Ray fixed the class upstream; safe_join guards are "
                "now belt-and-braces"
            )

    def test_sparse_partitions_emit_degenerates_on_nonempty_data(
        self, ray_session
    ):
        """The broader form that makes the class a REPO-WIDE hazard:
        map_groups over a nonempty dataset whose key space leaves some
        shuffle partitions empty emits zero-column blocks NEXT TO the
        real data — any downstream join is then a schema-resolution
        race, at every data scale."""
        t = _kv([1] * 100 + [2] * 100, list(range(200)))
        g = (
            ray.data.from_arrow(t)
            .repartition(8)
            .groupby("k")
            .map_groups(lambda x: x, batch_format="pyarrow")
        )
        blocks = [
            ray.get(ref)
            for b in g.materialize().iter_internal_ref_bundles()
            for ref, _ in b.blocks
        ]
        assert any(x.num_columns == 0 for x in blocks)
        assert sum(x.num_rows for x in blocks) == 200

    def test_safe_join_deterministic_on_sparse_mapgroups_left(
        self, ray_session
    ):
        """Contract: a left side flowing out of groupby/sort/map_groups
        declares itself via ``left_schema``; the distributed route then
        schema-guards it and the outcome is deterministic, not a race.
        (A map_batches/read-chain left is always typed and needs no
        declaration — and the broadcast route needs none either.)"""
        t = _kv([1] * 100 + [2] * 100, list(range(200)))
        left = (
            ray.data.from_arrow(t)
            .repartition(8)
            .groupby("k")
            .map_groups(lambda x: x, batch_format="pyarrow")
        )
        out = safe_join(
            left, _right(), on=("k",), broadcast_max=0,
            num_partitions=16, left_schema=KV,
        )
        assert out.count() == 200


class TestSafeJoin:
    def test_broadcast_route_survives_poisoned_left(self, ray_session):
        out = safe_join(
            _poisoned_left(), _right(), on=("k",), left_schema=KV
        ).take_all()
        assert sorted((r["k"], r["v"], r["w"]) for r in out) == [
            (1, 1, 10), (1, 2, 10), (2, 3, 20),
        ]

    def test_broadcast_route_without_left_schema(self, ray_session):
        out = safe_join(_poisoned_left(), _right(), on=("k",)).take_all()
        assert sorted((r["k"], r["v"], r["w"]) for r in out) == [
            (1, 1, 10), (1, 2, 10), (2, 3, 20),
        ]

    def test_distributed_route_survives_poisoned_left(self, ray_session):
        out = safe_join(
            _poisoned_left(), _right(), on=("k",),
            broadcast_max=0, left_schema=KV,
        ).take_all()
        assert sorted((r["k"], r["v"], r["w"]) for r in out) == [
            (1, 1, 10), (1, 2, 10), (2, 3, 20),
        ]

    def test_empty_left_from_groupby_chain(self, ray_session):
        left = (
            ray.data.from_arrow(_kv([1, 2], [1, 2]))
            .filter(expr="v > 100")
            .groupby("k")
            .aggregate(ray.data.aggregate.Count(alias_name="v"))
        )
        out = safe_join(left, _right(), on=("k",), left_schema=KV)
        assert out.count() == 0

    def test_empty_right_keeps_output_schema(self, ray_session):
        right = _right().filter(expr="w > 100")
        out = safe_join(
            ray.data.from_arrow(_kv([1], [1])), right, on=("k",)
        )
        assert out.count() == 0
        assert out.schema().names == ["k", "v", "w"]

    def test_left_outer_parity_with_plain_join(self, ray_session):
        left = ray.data.from_arrow(_kv([1, 3], [7, 8]))
        out = safe_join(
            left, _right(), on=("k",), join_type="left_outer"
        ).take_all()
        got = sorted(
            [(r["k"], r["v"], r["w"]) for r in out], key=lambda x: x[0]
        )
        assert got == [(1, 7, 10), (3, 8, None)]

    def test_right_on_and_key_drop(self, ray_session):
        right = ray.data.from_arrow(
            pa.table(
                {"kk": pa.array([1, 2], pa.int64()),
                 "w": pa.array([10, 20], pa.int64())}
            )
        )
        out = safe_join(
            ray.data.from_arrow(_kv([1, 2], [1, 2])), right,
            on=("k",), right_on=("kk",),
        )
        assert sorted(out.schema().names) == ["k", "v", "w"]
        assert out.count() == 2

    def test_value_parity_broadcast_vs_distributed(self, ray_session):
        """Both routes produce the identical result set on a corpus big
        enough to span blocks."""
        n = 5000
        left = ray.data.from_arrow(
            _kv(list(range(n)), [i * 3 for i in range(n)])
        )
        right = ray.data.from_arrow(
            pa.table(
                {"k": pa.array(range(0, n, 7), pa.int64()),
                 "w": pa.array(range(0, n, 7), pa.int64())}
            )
        )
        a = safe_join(left, right, on=("k",)).take_all()
        b = safe_join(left, right, on=("k",), broadcast_max=0).take_all()
        key = lambda r: (r["k"], r["v"], r["w"])  # noqa: E731
        assert sorted(map(key, a)) == sorted(map(key, b))


class TestSchemaGuard:
    def test_removes_degenerate_blocks(self, ray_session):
        guarded = schema_guard(_poisoned_left(), KV)
        blocks = [
            ray.get(ref)
            for b in guarded.materialize().iter_internal_ref_bundles()
            for ref, _ in b.blocks
        ]
        assert all(t.num_columns == 2 for t in blocks)
        j = guarded.join(
            _right(), join_type="inner", num_partitions=16, on=("k",)
        )
        assert j.count() == 3

    def test_empty_input_yields_typed_empty(self, ray_session):
        base = ray.data.from_arrow(_kv([1], [1])).filter(
            expr="v > 100"
        ).sort("k")
        guarded = schema_guard(base, KV)
        assert guarded.count() == 0
        assert guarded.schema().names == ["k", "v"]

    def test_int32_drift_pinned(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {"k": pa.array([1], pa.int32()),
                 "v": pa.array([2], pa.int32())}
            )
        )
        out = schema_guard(ds, KV)
        sch = out.schema()
        assert [str(t) for t in sch.types] == ["int64", "int64"]

    def test_collect_table_skips_degenerate(self, ray_session):
        t = collect_table(_poisoned_left(), KV)
        assert t.num_rows == 3 and t.schema == KV
        t0 = collect_table(
            ray.data.from_arrow([pa.table({})]), KV
        )
        assert t0.num_rows == 0 and t0.schema == KV


class TestAuditOpsOnRareAndEmptyPairSets:
    """Drive the join-bearing cluster-audit ops end-to-end over corpora
    engineered so the verified-edge set is EMPTY or a single RARE pair —
    the shapes that produced the round-2 and round-4 driver flakes."""

    def _mk_docs(self, tmp_path, texts):
        import pyarrow.parquet as pq

        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        n = len(texts)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(1, n + 1), pa.int64()),
                    "url": pa.array(
                        [f"https://ex{i}.com/p" for i in range(n)]
                    ),
                    "source": pa.array(["exA.com"] * n),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_cluster_chaining_audit_rare_single_pair(
        self, ray_session, tmp_path
    ):
        from adaptive_pdf_extractor_ray.pipelines import queries as q

        dup = (
            "the quick brown fox jumps over the lazy dog again and "
            "again while the river runs south past the old mill town "
        ) * 4
        texts = [dup, dup] + [
            f"unique document number {i} about topic {i * 17} with "
            f"entirely distinct content words alpha{i} beta{i} gamma{i} "
            f"delta{i} epsilon{i} zeta{i} eta{i} theta{i} iota{i} "
            f"kappa{i} lambda{i} mu{i} nu{i} xi{i} omicron{i} pi{i}"
            for i in range(48)
        ]
        out = q.q_cluster_chaining_audit(
            self._mk_docs(tmp_path, texts)
        ).take_all()
        assert len(out) == 1
        row = out[0]
        assert row["size"] == 2 and row["n_direct"] == 1
        assert row["n_chained"] == 0

    def test_cluster_chaining_audit_empty_pair_set(
        self, ray_session, tmp_path
    ):
        from adaptive_pdf_extractor_ray.pipelines import queries as q

        texts = [
            f"singleton text {i} lorem{i} ipsum{i} dolor{i} sit{i} "
            f"amet{i} consectetur{i} adipiscing{i} elit{i} sed{i} do{i} "
            f"eiusmod{i} tempor{i} incididunt{i} labore{i} dolore{i}"
            for i in range(30)
        ]
        out = q.q_cluster_chaining_audit(
            self._mk_docs(tmp_path, texts)
        ).take_all()
        assert out == []
