"""Persisted rule store — the distributed analog of the reference's cache.

The reference keeps one ``Cache`` per label in driver memory (a dict of
weight-ordered ``RulesList``s, ``/root/reference/src/cache.py:326-408``)
and fsyncs JSON after every learned rule (``src/main.py:283-286``). Here
the store is a small Arrow/Parquet table keyed by ``(fingerprint, field)``:

    fingerprint | field | pattern | validation_regex | weight | rule_id | rule_idx

- ``rule_id`` is a *content hash* of (fingerprint, field, pattern,
  validation_regex), so rules fitted independently on different workers
  dedupe and their weights merge commutatively (integer Sum) — the
  distributed replacement for the reference's in-place ``weight++`` and
  bubble-up (``src/cache.py:54-64,249-289``).
- try-order is the deterministic snapshot sort ``(weight desc, rule_idx
  asc)`` taken when the store is compiled for broadcast; weights change at
  checkpoint granularity, so output is independent of row visit order.
- persistence is one Parquet checkpoint per fit wave (vs per-rule fsync):
  the whole store for a 10^12-doc corpus is still only
  O(#templates × #fields × #rules) rows — broadcast-small by design.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.rules import FieldRules, Rule

RULES_SCHEMA = pa.schema(
    [
        ("fingerprint", pa.string()),
        ("field", pa.string()),
        ("pattern", pa.string()),
        ("validation_regex", pa.string()),
        ("weight", pa.int64()),
        ("rule_id", pa.int64()),
        ("rule_idx", pa.int64()),
        ("kind", pa.string()),
    ]
)


def rule_content_id(fingerprint: str, field: str, pattern: str, validation: str) -> int:
    h = hashlib.md5(f"{fingerprint}\x00{field}\x00{pattern}\x00{validation}".encode()).digest()
    return int.from_bytes(h[:8], "big") & ((1 << 62) - 1)


class RuleStore:
    """In-memory rule table with Parquet persistence and weight merging."""

    def __init__(self) -> None:
        # rule_id -> (fingerprint, field, Rule)
        self._rules: dict[int, tuple[str, str, Rule]] = {}
        # rule_id -> weight at load/creation time: lets a concurrent-safe
        # save() fold only this process's weight DELTA into the on-disk
        # table (commutative merge across shards sharing one store)
        self._base: dict[int, int] = {}
        # rule_id -> fit-origin weight floor raised by add()'s max()
        # branch this session: a refit raising a rule's weight is a
        # deterministic PRIOR, not an observed hit count, so merge takes
        # max(disk, floor) + hit-delta instead of treating the raise as
        # additive (which would inflate weights on every warm refit)
        self._fit_floor: dict[int, int] = {}

    # -- construction -----------------------------------------------------
    def add(self, fingerprint: str, field: str, rule: Rule) -> int:
        rid = rule_content_id(fingerprint, field, rule.pattern, rule.validation_regex)
        existing = self._rules.get(rid)
        if existing is None:
            rule.rule_id = rid
            self._rules[rid] = (fingerprint, field, rule)
            self._base.setdefault(rid, rule.weight)
        else:  # same content: keep the max weight / min idx seen
            old = existing[2]
            raised = max(0, rule.weight - old.weight)
            if raised:
                # a fit-origin weight raise is NOT this shard's observed
                # hit delta: raise _base by the same amount (so the
                # delta-merge save() folds only hit counts) and record
                # the floor (so the merge can still honor the raise via
                # max(disk, floor) instead of dropping it)
                old.weight += raised
                self._base[rid] = self._base.get(rid, 0) + raised
                self._fit_floor[rid] = max(
                    self._fit_floor.get(rid, 0), rule.weight
                )
            old.rule_idx = min(old.rule_idx, rule.rule_idx)
        return rid

    def add_fitted(self, fingerprint: str, fitted: dict[str, list[Rule]]) -> int:
        n = 0
        for field, rules in fitted.items():
            for r in rules:
                if rule_content_id(fingerprint, field, r.pattern, r.validation_regex) not in self._rules:
                    n += 1
                self.add(fingerprint, field, r)
        return n

    # -- weight accounting -------------------------------------------------
    def apply_hits(self, hits: dict[int, int]) -> None:
        """Fold grouped hit counts (rule_id -> n) into weights (Sum merge)."""
        for rid, n in hits.items():
            entry = self._rules.get(rid)
            if entry is not None:
                entry[2].weight += int(n)

    # -- views -------------------------------------------------------------
    def __len__(self) -> int:
        return len(self._rules)

    def fingerprints(self) -> set[str]:
        return {fp for fp, _, _ in self._rules.values()}

    def labels(self) -> set[str]:
        """Anchor labels implied by stored fields — discovered template
        families extend the fingerprinting vocabulary through the store."""
        from ..functions.templates import field_label

        return {field_label(f) for _, f, _ in self._rules.values()}

    def counts(self) -> dict[str, Any]:
        """Rule-count rollups — the reference's ``total_rules_in_local_cache``
        / ``total_rules_in_global_cache`` (``src/main.py:349-374``)."""
        per_fp: dict[str, int] = {}
        per_fp_fields: dict[str, set[str]] = {}
        for fp, field, _ in self._rules.values():
            per_fp[fp] = per_fp.get(fp, 0) + 1
            per_fp_fields.setdefault(fp, set()).add(field)
        return {
            "total_rules": len(self._rules),
            "fingerprints": len(per_fp),
            "rules_per_fingerprint": dict(sorted(per_fp.items())),
            "fields_per_fingerprint": {
                fp: len(fs) for fp, fs in sorted(per_fp_fields.items())
            },
        }

    def compiled(self) -> dict[str, dict[str, FieldRules]]:
        """fingerprint -> field -> FieldRules (sorted, regexes compiled)."""
        grouped: dict[str, dict[str, list[Rule]]] = {}
        for fp, field, rule in self._rules.values():
            grouped.setdefault(fp, {}).setdefault(field, []).append(rule)
        return {
            fp: {f: FieldRules(rs) for f, rs in fields.items()}
            for fp, fields in grouped.items()
        }

    def to_table(self) -> pa.Table:
        rows = sorted(
            self._rules.items(),
            key=lambda kv: (kv[1][0], kv[1][1], -kv[1][2].weight, kv[1][2].rule_idx),
        )
        return pa.table(
            {
                "fingerprint": [fp for _, (fp, _, _) in rows],
                "field": [f for _, (_, f, _) in rows],
                "pattern": [r.pattern for _, (_, _, r) in rows],
                "validation_regex": [r.validation_regex for _, (_, _, r) in rows],
                "weight": [r.weight for _, (_, _, r) in rows],
                "rule_id": [rid for rid, _ in rows],
                "rule_idx": [r.rule_idx for _, (_, _, r) in rows],
                "kind": [r.kind for _, (_, _, r) in rows],
            },
            schema=RULES_SCHEMA,
        )

    @classmethod
    def from_table(cls, table: pa.Table) -> "RuleStore":
        store = cls()
        for row in table.to_pylist():
            rule = Rule(
                pattern=row["pattern"],
                validation_regex=row["validation_regex"],
                weight=row["weight"],
                rule_id=row["rule_id"],
                rule_idx=row["rule_idx"],
                kind=row.get("kind", "regex"),
            )
            store._rules[row["rule_id"]] = (row["fingerprint"], row["field"], rule)
        return store

    # -- persistence -------------------------------------------------------
    def save(self, path: str, *, merge: bool = False) -> None:
        """Atomic Parquet checkpoint.

        ``merge=True`` makes the read-modify-write safe for concurrent
        workers sharing one store (the CLI's --shard mode): under an
        exclusive flock it re-loads the on-disk table and folds this
        process's changes in — rules missing locally are kept, and for
        shared rules the on-disk weight gets only this process's weight
        DELTA since load (commutative: N shards each adding their own
        hit counts sum correctly instead of last-writer-wins)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if not merge:
            tmp = path + ".tmp"
            pq.write_table(self.to_table(), tmp)
            os.replace(tmp, path)  # atomic checkpoint
            return
        import fcntl

        with open(path + ".lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if os.path.exists(path):
                    disk = RuleStore.from_table(pq.read_table(path))
                    for rid, (fp, field, r) in disk._rules.items():
                        mine = self._rules.get(rid)
                        if mine is None:
                            self._rules[rid] = (fp, field, r)
                            self._base[rid] = r.weight
                        else:
                            m = mine[2]
                            # hit-only delta (fit raises moved _base up);
                            # the fit-origin floor is honored via max()
                            # — idempotent across repeated warm refits,
                            # additive across shards' observed hits
                            delta = m.weight - self._base.get(rid, m.weight)
                            m.weight = max(
                                r.weight, self._fit_floor.get(rid, 0)
                            ) + max(0, delta)
                            m.rule_idx = min(m.rule_idx, r.rule_idx)
                # new baseline: a later save() in this process folds only
                # the changes made after this point
                self._base = {rid: e[2].weight for rid, e in self._rules.items()}
                self._fit_floor = {}
                tmp = path + ".tmp"
                pq.write_table(self.to_table(), tmp)
                os.replace(tmp, path)
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)

    @classmethod
    def load(cls, path: str) -> "RuleStore":
        if not os.path.exists(path):
            return cls()
        store = cls.from_table(pq.read_table(path))
        store._base = {rid: e[2].weight for rid, e in store._rules.items()}
        return store
