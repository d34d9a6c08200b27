"""Rule application stage — the fast path, as a stateful actor pool.

The reference's per-document fast path (``extract_with_cache``,
``/root/reference/src/pipeline.py:22-64``) over a driver-held cache dict
becomes ``ds.map_batches(RuleApplier, concurrency=N)``: the broadcast rule
table (tiny — O(templates × fields × rules)) is fetched once per actor via
``ray.get`` in ``__init__`` and compiled; each ``__call__`` applies rules
to an Arrow batch. This is the broadcast-join pattern for the reference's
``dict_caches[label]`` lookup (``src/main.py:193-198``): no shuffle, the
small side ships to every actor once.

Output columns:
  extracted_json  per-row JSON object field -> value (null for explicit
                  null fields — the "" sentinel already folded)
  missing         list<string> fields with no validating rule (slow path)
  hit_rule_ids    list<int64> matched rule ids (weight accounting — the
                  dataflow analog of CacheItem.increment,
                  src/cache.py:54-64)
  n_missing       int32 convenience for the miss filter
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.rules import extract_row
from ..functions.templates import (
    UNKNOWN_FINGERPRINT,
    fingerprint_text,
    span_extract_offsets,
)
from ..state.rulestore import RuleStore


def _resolve_store(rules_ref) -> RuleStore:
    """Accept a ``(store_path, mtime)`` tuple (the durable form: plain
    values survive actor restarts — ray#53727 loses object-store
    constructor args), an ObjectRef (broadcast), an Arrow table, or a
    RuleStore. The flagship passes the path form: each actor loads the
    checkpointed parquet once in ``__init__``; the mtime pins WHICH
    checkpoint the wave was launched against (identity only — the load
    itself reads the path)."""
    import os

    import ray

    if isinstance(rules_ref, tuple):
        path, _mtime = rules_ref
        return RuleStore.load(path) if os.path.exists(path) else RuleStore()
    if isinstance(rules_ref, str):
        return RuleStore.load(rules_ref) if os.path.exists(rules_ref) else RuleStore()
    if isinstance(rules_ref, ray.ObjectRef):
        rules_ref = ray.get(rules_ref)
    if isinstance(rules_ref, pa.Table):
        return RuleStore.from_table(rules_ref)
    if isinstance(rules_ref, RuleStore):
        return rules_ref
    raise TypeError(f"unsupported rules ref: {type(rules_ref)}")


class RuleApplier:
    """Callable-class stage; construct with the broadcast rule table."""

    def __init__(self, rules_ref, merge_with: str | None = None):
        from ..functions.templates import field_label

        store = _resolve_store(rules_ref)
        self.compiled = store.compiled()  # fingerprint -> field -> FieldRules
        self.merge_with = merge_with  # optional column of prior partial answers
        # per-fingerprint anchor vocabulary for the span fast path: one
        # linear scan per doc replaces per-field tempered-regex scans when
        # the fingerprint's rules are span-kind (fitted anchor rules)
        self.vocab: dict[str, list[str]] = {}
        for fp, fields in self.compiled.items():
            if any(
                r.kind in ("span", "span_null")
                for fr in fields.values()
                for r in fr.rules
            ):
                self.vocab[fp] = [field_label(f) for f in fields]
        # union vocabulary for refining rows the fingerprinter stamped
        # 'unk' before their family's labels were discovered
        self.all_labels: list[str] = sorted(
            {field_label(f) for fields in self.compiled.values() for f in fields},
            key=lambda s: (-len(s), s),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text_norm"].to_pylist()
        fps = batch["fingerprint"].to_pylist()
        prior_hits: list[list[int]] | None = None
        prior_spans: list[str | None] | None = None
        if self.merge_with and self.merge_with in batch.column_names:
            prior = batch[self.merge_with].to_pylist()
            prior_missing = batch["missing"].to_pylist()
            prior_nm = batch["n_missing"].to_pylist()
            if "hit_rule_ids" in batch.column_names:
                prior_hits = batch["hit_rule_ids"].to_pylist()
            if "spans_json" in batch.column_names:
                prior_spans = batch["spans_json"].to_pylist()
            # n_missing < 0 marks "fingerprint had no rules at all": retry
            # every field of the (now possibly fitted) template
            subsets = [
                None if (nm is None or nm < 0) else list(m)
                for m, nm in zip(prior_missing, prior_nm)
            ]
        else:
            prior = [None] * len(batch)
            subsets = [None] * len(batch)

        # per-record extraction target (reference src/data.py:157-168):
        # when present, the record's extraction_schema — not the set of
        # fitted rules — defines WHICH fields this row extracts (both
        # restricting discovered anchors and extending past the registry)
        schema_lists = (
            batch["schema_fields"].to_pylist()
            if "schema_fields" in batch.column_names else None
        )

        extracted_out: list[str | None] = []
        spans_out: list[str | None] = []
        missing_out: list[list[str]] = []
        nm_out: list[int] = []
        hits_out: list[list[int]] = []
        fps_out: list[str] = []
        for row_i, (text, fp, prior_json, fields_subset) in enumerate(
            zip(texts, fps, prior, subsets)
        ):
            schema = schema_lists[row_i] if schema_lists else None
            field_rules = self.compiled.get(fp)
            if (
                field_rules is None
                and text is not None
                and fp == UNKNOWN_FINGERPRINT
                and self.all_labels
            ):
                refined = fingerprint_text(text, self.all_labels)
                if refined in self.compiled:
                    fp = refined
                    field_rules = self.compiled[fp]
            fps_out.append(fp)
            if field_rules is None or text is None:
                # unknown template (-1 sentinel) or parse failure; with a
                # row schema the retry set is known precisely
                if fields_subset is not None:
                    target = list(fields_subset)
                elif schema and text is not None:
                    target = list(schema)
                else:
                    target = []
                extracted_out.append(prior_json)
                spans_out.append(prior_spans[row_i] if prior_spans else None)
                missing_out.append(target)
                nm_out.append(len(target) if target else -1)
                hits_out.append([])
                continue
            if fields_subset is not None:
                target_fields = list(fields_subset)
            elif schema:
                target_fields = list(schema)
            else:
                target_fields = list(field_rules)
            vocab = self.vocab.get(fp)
            spans = span_extract_offsets(text, vocab) if vocab else None
            ans, _, missing, hits, offsets = extract_row(
                field_rules, text, target_fields, spans
            )
            sp = {f: list(se) for f, se in offsets.items()}
            if prior_json:
                merged = json.loads(prior_json)
                merged.update(ans)
                ans = merged
            if prior_spans and prior_spans[row_i]:
                sp_merged = json.loads(prior_spans[row_i])
                sp_merged.update(sp)
                sp = sp_merged
            extracted_out.append(json.dumps(ans, ensure_ascii=False, sort_keys=True))
            spans_out.append(json.dumps(sp, ensure_ascii=False, sort_keys=True))
            missing_out.append(missing)
            nm_out.append(len(missing))
            hits_out.append(list(hits.values()))

        if prior_hits is not None:  # wave-1 hits on partially-missing rows count too
            hits_out = [old + new for old, new in zip(prior_hits, hits_out)]

        out = batch.drop_columns(
            [c for c in ("extracted_json", "spans_json", "missing",
                         "hit_rule_ids", "n_missing")
             if c in batch.column_names]
        )
        if "fingerprint" in out.column_names:  # refined 'unk' rows
            out = out.set_column(
                out.column_names.index("fingerprint"), "fingerprint",
                pa.array(fps_out, pa.string()),
            )
        out = out.append_column("extracted_json", pa.array(extracted_out, pa.string()))
        out = out.append_column("spans_json", pa.array(spans_out, pa.string()))
        out = out.append_column("missing", pa.array(missing_out, pa.list_(pa.string())))
        out = out.append_column("hit_rule_ids", pa.array(hits_out, pa.list_(pa.int64())))
        out = out.append_column("n_missing", pa.array(nm_out, pa.int32()))
        return out


class ExtractBatch(RuleApplier):
    """Fused stateful stage: parse -> normalize -> fingerprint -> apply in
    one actor ``__call__``.

    One actor pool owns all per-doc compute (regexes + rule table compiled
    once in ``__init__``), so the pool's size IS the pipeline's
    parallelism; only the lightweight parquet read/write stages run as
    tasks around it. This is the stateful-actor-pool shape the north star
    prescribes, without fusing task stages into a pool bottleneck.
    """

    def __init__(self, rules_ref, vocab: list[str], merge_with: str | None = None,
                 pdf_layout: str = "linear"):
        from .parse import make_fingerprint_fn

        super().__init__(rules_ref, merge_with)
        self.vocab_list = list(vocab)
        self.pdf_layout = pdf_layout
        self._fingerprint = make_fingerprint_fn(vocab)

    def _grid_rows(self, batch: pa.Table) -> dict[int, dict]:
        """pdf_layout="grid": extract detached-header card PDFs from
        positional runs (functions/layout.py) — the layouts whose labels
        and values sit on different lines, x-aligned by column, which the
        linear text path cannot see (the reference pays an LLM for
        these). Rows where the grid finds no labels fall through to the
        linear path untouched."""
        from ..functions.layout import grid_extract
        from ..functions.templates import fingerprint_of_labels, label_to_field
        from ..sources.pdfio import PDF_MAGIC, parse_pdf_runs

        labels = {label_to_field(lab): lab for lab in self.vocab_list}
        out: dict[int, dict] = {}
        for i, payload in enumerate(batch["html"].to_pylist()):
            if payload is None:
                continue
            if bytes(payload[: len(PDF_MAGIC)]) != PDF_MAGIC:
                continue
            try:
                ans = grid_extract(parse_pdf_runs(payload), labels)
            except Exception:
                continue  # linear path parses/reports the row
            if ans:
                out[i] = {
                    "extracted_json": json.dumps(
                        ans, ensure_ascii=False, sort_keys=True
                    ),
                    "fingerprint": fingerprint_of_labels(
                        [labels[f] for f in ans]
                    ),
                }
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .parse import normalize_batch, parse_batch

        grid = (
            self._grid_rows(batch)
            if self.pdf_layout == "grid" and "html" in batch.column_names
            else {}
        )
        b = parse_batch(batch)
        b = normalize_batch(b)
        b = self._fingerprint(b)
        out = super().__call__(b)
        if not grid:
            return out
        # override the grid-resolved rows: fully extracted, no rule hits
        cols = {
            "extracted_json": out["extracted_json"].to_pylist(),
            "spans_json": out["spans_json"].to_pylist(),
            "missing": out["missing"].to_pylist(),
            "hit_rule_ids": out["hit_rule_ids"].to_pylist(),
            "n_missing": out["n_missing"].to_pylist(),
            "fingerprint": out["fingerprint"].to_pylist(),
        }
        for i, g in grid.items():
            cols["extracted_json"][i] = g["extracted_json"]
            cols["spans_json"][i] = "{}"  # grid values have no text spans
            cols["missing"][i] = []
            cols["hit_rule_ids"][i] = []
            cols["n_missing"][i] = 0
            cols["fingerprint"][i] = g["fingerprint"]
        types = {
            "extracted_json": pa.string(), "spans_json": pa.string(),
            "missing": pa.list_(pa.string()),
            "hit_rule_ids": pa.list_(pa.int64()),
            "n_missing": pa.int32(), "fingerprint": pa.string(),
        }
        for name, vals in cols.items():
            out = out.set_column(
                out.column_names.index(name), name,
                pa.array(vals, types[name]),
            )
        return out


def fingerprint_bucket(fp: str, num_buckets: int) -> int:
    """Stable fingerprint -> bucket assignment (md5-based, worker-safe)."""
    import hashlib

    return int.from_bytes(
        hashlib.md5(fp.encode("utf-8")).digest()[:4], "big"
    ) % num_buckets


# per-worker cache: (store_path, mtime, bucket) -> compiled RuleApplier.
# Worker processes persist across tasks, so each bucket's rules compile
# once per worker even though map_groups runs as stateless tasks.
_BUCKET_APPLIER_CACHE: dict = {}


def make_bucket_applier(store_path: str, num_buckets: int):
    """Sharded-store apply for extreme template cardinality.

    The broadcast pattern ships (and compiles) the WHOLE rule table in
    every actor — fine to ~1M rules, prohibitive beyond (compile time and
    heap scale with store size). This path instead co-locates each
    fingerprint bucket's rows via ``groupby("bucket")`` and loads/compiles
    only that bucket's slice of the store (parquet filter pushdown on the
    fingerprint hash), so per-worker state is ``O(store / num_buckets)``.
    Trade: one all-to-all shuffle of the page rows per wave — the
    documented fallback in SCALING.md, not the default.
    """

    def apply_bucket(group: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        bucket = group["bucket"][0].as_py()
        key = (store_path, os.path.getmtime(store_path), bucket)
        applier = _BUCKET_APPLIER_CACHE.get(key)
        if applier is None:
            full = pq.read_table(store_path)
            mask = [
                fingerprint_bucket(fp, num_buckets) == bucket
                for fp in full["fingerprint"].to_pylist()
            ]
            applier = RuleApplier(full.filter(pa.array(mask)))
            _BUCKET_APPLIER_CACHE[key] = applier
        out = applier(group.drop_columns(["bucket"]))
        return out

    return apply_bucket


def hit_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregation of rule hits: (rule_id, hits) rows.

    Pre-aggregating inside map_batches keeps the downstream Sum merge tiny
    (SURVEY §2.5 A4 partial+final pattern).
    """
    counts: dict[int, int] = {}
    for ids in batch["hit_rule_ids"].to_pylist():
        for rid in ids:
            counts[rid] = counts.get(rid, 0) + 1
    return pa.table(
        {
            "rule_id": pa.array(list(counts.keys()), pa.int64()),
            "hits": pa.array(list(counts.values()), pa.int64()),
        }
    )


def answer_partials(batch: pa.Table) -> pa.Table:
    """One-pass per-batch partials for BOTH weight accounting and run
    metrics: rows are (key, n) where key is ``hit:<rule_id>`` or
    ``metric:<name>`` (rows / errors / miss_rows / kind=<kind> counts).
    A single column-pruned read serves rule weights and the per-block
    row-count/error metrics the north rule requires.
    """
    import pyarrow.compute as pc

    counts: dict[str, int] = {"metric:rows": len(batch)}
    for ids in batch["hit_rule_ids"].to_pylist():
        for rid in ids:
            k = f"hit:{rid}"
            counts[k] = counts.get(k, 0) + 1
    counts["metric:errors"] = int(pc.sum(pc.is_valid(batch["error"]).cast("int64")).as_py() or 0)
    nm = batch["n_missing"]
    counts["metric:miss_rows"] = int(
        pc.sum(pc.cast(pc.not_equal(nm, 0), "int64")).as_py() or 0
    )
    for kind, n in zip(*pa.compute.value_counts(batch["kind"]).flatten()):
        counts[f"metric:kind={kind.as_py()}"] = n.as_py()
    return pa.table(
        {
            "key": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        }
    )
