"""The flagship adaptive-extraction pipeline (two-wave, checkpointed).

Rebuild of the reference lifecycle (``/root/reference/src/main.py:143-402``)
as a streaming Ray Data dataflow:

    read pages -> parse (PDF/HTML/text) -> normalize -> fingerprint
      -> wave 1: apply broadcast rule store (actor pool)        [fast path]
      -> checkpoint wave1 parquet (resumable; also carries extracted text)
      -> misses only: groupby(fingerprint) -> deterministic fit [slow path]
      -> rule store merge + atomic checkpoint -> broadcast
      -> wave 2: re-apply to miss rows (missing fields only) -> union
      -> write answers parquet (partitioned) + fold hit counts into weights

Scale notes (the design assumptions, per SURVEY §4):
- the only all-to-all steps are the *miss-row* groupby (bounded by
  template cardinality after wave 1 warms) and the tiny rule-hit Sum;
- the rule store is broadcast via ``ray.put`` once per wave, never
  shipped per batch;
- wave1 parquet doubles as the resume checkpoint: a rerun with the same
  ``work_dir`` skips parse+apply for completed shards (`_done` marker);
- heavy ``html`` bytes are dropped at the parse stage; downstream blocks
  carry only narrow string/list columns.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.templates import UNKNOWN_FINGERPRINT, default_vocab
from ..stages.apply import ExtractBatch, RuleApplier, answer_partials
from ..stages.fit import FitGroup
from ..stages.parse import make_fingerprint_fn, normalize_batch, parse_batch
from ..state.rulestore import RuleStore

try:  # Ray-internal sink class (pinned ray 2.49); fall back gracefully
    from ray.data._internal.datasource.parquet_datasink import (
        ParquetDatasink as _ParquetDatasink,
    )
except ImportError:  # pragma: no cover - older/newer ray layout
    _ParquetDatasink = None


if _ParquetDatasink is not None:

    class _MetricsParquetDatasink(_ParquetDatasink):
        """Parquet sink whose write tasks ALSO return their block's
        answer partials (hit/metric counts) as the write result, merged
        on the driver in ``on_write_complete`` — the single-pass
        replacement for the post-write metrics re-read when a wave runs
        in-session (the re-read was ~30% of a warm run). Retry-safe by
        construction: only write tasks that COMMIT contribute a result,
        so a retried task never double-counts (unlike a side-channel
        counter actor). ``refit_only`` restricts the counted rows (wave
        1 also writes refit=1 miss rows, whose final metrics come from
        wave 2)."""

        def __init__(self, *args, refit_only: int | None = None, **kwargs):
            super().__init__(*args, **kwargs)
            self._refit_only = refit_only
            self.merged: dict[str, int] | None = None

        def write(self, blocks, ctx):
            from ray.data.block import BlockAccessor

            blocks = list(blocks)
            counts: dict[str, int] = {}
            for b in blocks:
                t = BlockAccessor.for_block(b).to_arrow()
                if self._refit_only is not None and "refit" in t.column_names:
                    t = t.filter(
                        pc.equal(t["refit"], self._refit_only)
                    )
                if t.num_rows:
                    p = answer_partials(t)
                    for k, n in zip(
                        p["key"].to_pylist(), p["n"].to_pylist()
                    ):
                        counts[k] = counts.get(k, 0) + n
            super().write(blocks, ctx)
            return counts

        def on_write_complete(self, write_result):
            merged: dict[str, int] = {}
            for counts in write_result.write_returns:
                for k, n in (counts or {}).items():
                    merged[k] = merged.get(k, 0) + n
            self.merged = merged
            super().on_write_complete(write_result)

else:  # pragma: no cover
    _MetricsParquetDatasink = None

def _named(callable_obj):
    """map_groups requires a __name__-bearing fn; wrap callable instances."""

    def fn(group):
        return callable_obj(group)

    fn.__name__ = type(callable_obj).__name__
    return fn


FINAL_COLUMNS = [
    "url", "warc_ts", "lang", "kind", "error", "fingerprint", "text_norm",
    "extracted_json", "spans_json", "missing", "hit_rule_ids", "n_missing",
]

# above this many sampled exemplar rows, rule fitting runs as a
# distributed groupby instead of on the driver
DRIVER_FIT_LIMIT = 50_000


def _wave1_fits_in_object_store(pages: ray.data.Dataset) -> bool:
    """Whether wave-1 output blocks can be HELD in the object store for
    the in-session fast path (wave 2 + metrics read the cached blocks
    instead of re-reading the checkpoint parquet from disk). The parquet
    checkpoint is still written either way — it stays the crash-resume
    unit; this only removes the disk ROUND-TRIP of a healthy run.
    Conservative: require the (metadata-estimated) input size ×3 to fit
    in the cluster's object store, else stream-and-reread as before
    (at 100 TB the pipeline must not pin the corpus in memory)."""
    try:
        est = pages.size_bytes()
        cap = ray.cluster_resources().get("object_store_memory", 0)
    except Exception:
        return False
    return bool(est) and bool(cap) and est * 3 < cap


def prepare(pages: ray.data.Dataset, vocab: list[str], *,
            batch_size: int = 1024, **_ignored) -> ray.data.Dataset:
    """parse -> normalize -> fingerprint (stateless tasks; Ray fuses the
    three stages with the read into one elastic task chain)."""
    return (
        pages.map_batches(parse_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
        .map_batches(normalize_batch, batch_format="pyarrow",
                     batch_size=batch_size, zero_copy_batch=True)
        .map_batches(make_fingerprint_fn(vocab), batch_format="pyarrow",
                     batch_size=batch_size)
    )


def _answer_files(dirs: list[str]) -> list[str]:
    """Expand answer dirs to their parquet files (a multi-element list
    of DIRECTORY paths is read as file paths by read_parquet and fails;
    single dirs pass through so empty-dir edge cases keep their old
    behavior)."""
    if len(dirs) <= 1:
        return dirs
    import glob as _glob

    out: list[str] = []
    for d in dirs:
        out.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))) or [d])
    return out


def _make_size_filter(threshold: int, *, keep_over: bool):
    """Vectorized payload-size split for the oversize route: size =
    html binary bytes + text utf-8 chars (0 for nulls)."""

    def f(t: pa.Table) -> pa.Table:
        z = pa.scalar(0, pa.int64())
        size = pa.nulls(t.num_rows, pa.int64()).fill_null(0)
        if "html" in t.column_names:
            size = pc.add(size, pc.coalesce(
                pc.cast(pc.binary_length(t["html"]), pa.int64()), z))
        if "text" in t.column_names:
            size = pc.add(size, pc.coalesce(
                pc.cast(pc.utf8_length(t["text"]), pa.int64()), z))
        over = pc.greater(size, pa.scalar(threshold, pa.int64()))
        return t.filter(over if keep_over else pc.invert(over))

    return f


def extract_pages(
    pages: ray.data.Dataset,
    work_dir: str,
    *,
    store_path: str | None = None,
    vocab: list[str] | None = None,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 1024,
    max_exemplars: int = 8,
    write_answers: bool = True,
    apply_shards: int | None = None,
    pdf_layout: str = "linear",
    hold_wave1_blocks: bool | None = None,
    report=None,
    oversize_bytes: int | None = None,
) -> dict[str, Any]:
    """Run the full two-wave pipeline; returns {'answers': Dataset, ...stats}.

    ``report``: optional callable ``(metrics: dict) -> None`` invoked once
    per run with the final metrics record — the pluggable experiment-sink
    hook (the reference pushes the same accounting to wandb,
    ``/root/reference/src/metrics.py:386-416``; here the default sinks are
    the local ``metrics.json`` + the per-store ``.history.jsonl`` drift
    ledger, and a callback can forward to any external tracker). Sink
    failures are swallowed — reporting must never fail the run.

    ``oversize_bytes``: when set, wave 1 routes rows whose raw payload
    (html binary + text) exceeds this threshold through a
    ``batch_size=1`` branch of the same actor pool — the skew guard for
    a mixed corpus where most pages are ~2 KB but a few PDFs are
    hundreds of MB. With row-count batching a 1024-row batch can
    otherwise accumulate many giant rows in one worker heap; routing
    pins oversized rows to one-per-batch (memory ceiling = one payload)
    while normal rows keep the vectorized batch size. Costs a second
    scan of the input, so it is opt-in. Output is row-identical to the
    unrouted plan (equivalence-tested)."""
    t0 = time.time()
    os.makedirs(work_dir, exist_ok=True)
    store_path = store_path or os.path.join(work_dir, "rules.parquet")
    store = RuleStore.load(store_path)
    if vocab is None:
        # discovered template families persist their labels through the
        # store, so warm runs fingerprint them correctly from wave 1
        vocab = sorted(set(default_vocab()) | store.labels(),
                       key=lambda s: (-len(s), s))

    # a per-record extraction_schema column (reference-ingest path) rides
    # through wave 1's parquet so wave 2 can honor it on miss rows
    try:
        schema_names = pages.schema().names
    except Exception:
        schema_names = []
    final_cols = FINAL_COLUMNS + (
        ["schema_fields"] if "schema_fields" in (schema_names or []) else []
    )

    phases: dict[str, float] = {}
    # wave-1 output is written partitioned by refit status: rows fully
    # extracted land in ``refit=0`` (final — never rewritten), miss rows in
    # ``refit=1`` (re-processed by wave 2 into ``wave2/``). The final answer
    # set = refit=0 ∪ wave2: each row is written exactly once per wave it
    # participates in, which is what makes warm runs ~single-pass.
    wave1_dir = os.path.join(work_dir, "wave1")
    done0_dir = os.path.join(wave1_dir, "refit=0")
    miss_dir = os.path.join(wave1_dir, "refit=1")
    wave2_dir = os.path.join(work_dir, "wave2")
    wave1_done = os.path.join(work_dir, "wave1._done")
    # per-wave metric partials accumulated by the write sinks (None when
    # a wave was skipped on resume -> fall back to the parquet re-read)
    wave1_partials: dict[str, int] | None = None
    wave2_partials: dict[str, int] | None = None
    # in-session block reuse (healthy-run fast path): wave 2 and the
    # metrics pass consume wave 1's materialized blocks from the object
    # store instead of re-reading the checkpoint parquet
    inmem_wave1: ray.data.Dataset | None = None
    inmem_wave2: ray.data.Dataset | None = None
    if not os.path.exists(wave1_done):  # resumable: skip completed wave 1
        if apply_shards:
            # sharded-store path (extreme template cardinality): parse as
            # elastic tasks, co-locate fingerprint buckets, load/compile
            # only each bucket's slice of the store per worker
            from ..stages.apply import fingerprint_bucket, make_bucket_applier

            store.save(store_path)  # bucket appliers read from disk
            prepared = prepare(pages, vocab, batch_size=batch_size)

            def add_bucket(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "bucket",
                    pa.array(
                        [fingerprint_bucket(fp, apply_shards)
                         for fp in t["fingerprint"].to_pylist()],
                        pa.int64(),
                    ),
                )

            applied = (
                prepared.map_batches(add_bucket, batch_format="pyarrow",
                                     zero_copy_batch=True)
                .groupby("bucket")
                .map_groups(make_bucket_applier(store_path, apply_shards),
                            batch_format="pyarrow")
            )
        else:
            # constructor args are plain values (path + mtime), not object
            # store refs: a restarted actor reloads the rule checkpoint
            # from disk instead of failing on a lost ObjectRef (ray#53727)
            mtime = os.path.getmtime(store_path) if os.path.exists(store_path) else 0.0
            pool_kwargs: dict[str, Any] = dict(
                fn_constructor_args=((store_path, mtime), vocab),
                fn_constructor_kwargs={"pdf_layout": pdf_layout},
                batch_format="pyarrow",
                concurrency=concurrency,
                zero_copy_batch=True,
            )
            if oversize_bytes:
                small = pages.map_batches(
                    _make_size_filter(oversize_bytes, keep_over=False),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
                big = pages.map_batches(
                    _make_size_filter(oversize_bytes, keep_over=True),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
                applied = small.map_batches(
                    ExtractBatch, batch_size=batch_size, **pool_kwargs
                ).union(
                    big.map_batches(ExtractBatch, batch_size=1, **pool_kwargs)
                )
            else:
                applied = pages.map_batches(
                    ExtractBatch, batch_size=batch_size, **pool_kwargs
                )
        applied = applied.select_columns(final_cols).map_batches(
            lambda t: t.append_column(
                "refit",
                pc.cast(pc.not_equal(t["n_missing"], 0), pa.int32()),
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # hold blocks only when a fit wave is EXPECTED (cold store): the
        # materialize barrier costs the apply->write streaming overlap,
        # which is pure loss on warm runs that never re-read the misses
        hold = (
            hold_wave1_blocks
            if hold_wave1_blocks is not None
            else len(store) == 0
        )
        if hold and _wave1_fits_in_object_store(pages):
            applied = applied.materialize()
            inmem_wave1 = applied
        if _MetricsParquetDatasink is not None and write_answers:
            # single-pass metrics: the write tasks count the refit=0
            # (final) rows they commit, so the post-write metrics
            # re-read is skipped entirely on healthy runs
            sink1 = _MetricsParquetDatasink(
                wave1_dir, partition_cols=["refit"], refit_only=0,
                arrow_parquet_args={"compression": "zstd"},
            )
            applied.write_datasink(sink1)
            wave1_partials = sink1.merged
        else:
            applied.write_parquet(wave1_dir, partition_cols=["refit"],
                                  compression="zstd")
        with open(wave1_done, "w") as f:
            f.write(json.dumps({"ts": time.time()}))
    phases["wave1"] = time.time() - t0

    # --- wide step: fit rules per fingerprint over miss rows only -------
    # Sampling happens BEFORE the shuffle: each batch forwards at most
    # ``max_exemplars`` rows per fingerprint, so the groupby moves
    # O(fingerprints × exemplars × read-parallelism) rows, never the
    # corpus (cold start would otherwise shuffle everything — the skew
    # guard from SURVEY §4).
    # The 'unk' fingerprint pools EVERY yet-unrecognized template family,
    # and FitGroup's family discovery needs a sample of its full diversity
    # (it peels families from max(16*max_exemplars, 128) texts) — capping
    # it at max_exemplars like a known template would starve discovery of
    # all but the first family whenever one batch holds the misses.
    unk_cap = max(16 * max_exemplars, 128)

    def sample_exemplars(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text_norm"]))
        keep: list[int] = []
        seen: dict[str, int] = {}
        for i, fp in enumerate(t["fingerprint"].to_pylist()):
            cap = unk_cap if fp == UNKNOWN_FINGERPRINT else max_exemplars
            if seen.get(fp, 0) < cap:
                seen[fp] = seen.get(fp, 0) + 1
                keep.append(i)
        return t.take(pa.array(keep, pa.int64()))

    fitted_rows = 0
    have_miss_rows = os.path.isdir(miss_dir)
    # resumable like wave 1: a completed fit must NOT re-run on resume —
    # exemplar sampling depends on block layout, so a re-fit over the
    # checkpointed miss rows can add a (valid but different) extra rule,
    # silently mutating a finished store (weights AND membership)
    fit_done = os.path.join(work_dir, "fit._done")
    fit_needed = have_miss_rows and not os.path.exists(fit_done)
    fitter = FitGroup(vocab, max_exemplars=max_exemplars)
    if fit_needed:
        # the per-batch cap bounds rows at max_exemplars × fps per READ
        # TASK, which still multiplies under extreme read parallelism ×
        # template cardinality — so the sampled set is materialized into
        # the (distributed, spillable) object store and only its COUNT
        # decides the route; the driver never pulls an unbounded set
        if inmem_wave1 is not None:
            miss_src = inmem_wave1.filter(expr="refit == 1").select_columns(
                ["fingerprint", "text_norm"]
            )
        else:
            miss_src = ray.data.read_parquet(
                miss_dir, columns=["fingerprint", "text_norm"]
            )
        sampled = miss_src.map_batches(
            sample_exemplars, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        n_sampled = sampled.count()
    else:
        n_sampled = 0
    if n_sampled == 0:
        rule_rows = []
    elif n_sampled <= DRIVER_FIT_LIMIT:
        # moderate template cardinality: fit on the driver (exemplar set is
        # tiny; a Ray groupby would cost more in shuffle machinery)
        by_fp: dict[str, list[str]] = {}
        for r in sampled.take_all():
            by_fp.setdefault(r["fingerprint"], []).append(r["text_norm"])
        rule_rows = []
        for fp, texts in sorted(by_fp.items()):
            tbl = fitter(pa.table({
                "fingerprint": pa.array([fp] * len(texts), pa.string()),
                "text_norm": pa.array(texts, pa.string()),
            }))
            rule_rows.extend(tbl.to_pylist())
    else:
        # huge template cardinality: distribute the fit as the wide step
        # (a second per-group cap inside FitGroup bounds each group to
        # max_exemplars regardless of how many read tasks contributed)
        rule_rows = (
            sampled.groupby("fingerprint")
            .map_groups(_named(fitter), batch_format="pyarrow")
        ).take_all()  # O(templates × fields × 3)
    if rule_rows:
        from ..functions.rules import Rule

        new_store_rows = 0
        for row in rule_rows:
            r = Rule(
                pattern=row["pattern"],
                validation_regex=row["validation_regex"],
                weight=row["weight"],
                rule_idx=row["rule_idx"],
                kind=row.get("kind", "regex"),
            )
            before = len(store)
            store.add(row["fingerprint"], row["field"], r)
            new_store_rows += len(store) - before
        fitted_rows = new_store_rows
        # merge=True: concurrent shards sharing one store fold their
        # fitted rules / weight deltas instead of last-writer-wins
        store.save(store_path, merge=True)
    if fit_needed:  # marker AFTER the store checkpoint (crash-safe order)
        with open(fit_done, "w") as f:
            f.write(json.dumps({"ts": time.time(), "fitted": fitted_rows}))
    phases["fit"] = time.time() - t0 - sum(phases.values())

    # --- wave 2: re-apply only the refit=1 partition with updated rules --
    if have_miss_rows and not os.path.isdir(wave2_dir):
        if not os.path.exists(store_path):
            # nothing was fitted (no store on disk yet): checkpoint the
            # (possibly empty) store so wave-2 actors have a path to load
            store.save(store_path)
        mtime2 = os.path.getmtime(store_path)
        if inmem_wave1 is not None:  # healthy-run fast path: no disk re-read
            miss_rows_ds = inmem_wave1.filter(expr="refit == 1")
        else:
            miss_rows_ds = ray.data.read_parquet(miss_dir)
        wave2 = miss_rows_ds.map_batches(
            RuleApplier,
            fn_constructor_args=((store_path, mtime2), "extracted_json"),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            zero_copy_batch=True,
        ).select_columns(final_cols)
        if inmem_wave1 is not None:
            wave2 = wave2.materialize()
            inmem_wave2 = wave2
        # atomic: write to a temp dir, rename when complete (resume-safe)
        tmp_dir = wave2_dir + "._tmp"
        if os.path.isdir(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        if _MetricsParquetDatasink is not None and write_answers:
            sink2 = _MetricsParquetDatasink(
                tmp_dir, arrow_parquet_args={"compression": "zstd"},
            )
            wave2.write_datasink(sink2)
            wave2_partials = sink2.merged
        else:
            wave2.write_parquet(tmp_dir, compression="zstd")
        os.replace(tmp_dir, wave2_dir)
    phases["wave2"] = time.time() - t0 - sum(phases.values())

    answer_dirs = [d for d in (done0_dir, wave2_dir) if os.path.isdir(d)]
    # expand dirs to files: read_parquet resolves a SINGLE directory fine
    # but a multi-element list of directories is treated as file paths
    # (partial-hit warm runs — some rows final in refit=0, some refit —
    # produce exactly that two-dir case)
    answers = ray.data.read_parquet(
        _answer_files(answer_dirs), columns=FINAL_COLUMNS
    )
    stats: dict[str, Any] = {
        "rules_fitted": fitted_rows,
        "phases": phases,
        "answer_dirs": answer_dirs,
    }

    hits_done = os.path.join(work_dir, "hits._done")
    if write_answers and os.path.exists(hits_done):
        # resume of a COMPLETED run: the hit counts from these answers are
        # already folded into the store — folding again would double-count
        # every weight on every rerun (idempotent-resume guard)
        metrics_path = os.path.join(work_dir, "metrics.json")
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                stats["metrics"] = json.load(f).get("metrics", {})
    elif write_answers:
        # one column-pruned pass serves BOTH weight accounting and run
        # metrics: per-batch partials -> driver-side Sum merge (commutative
        # integer adds; a distributed groupby would shuffle more rows in
        # machinery than the partials contain). When this run's blocks are
        # still in the object store (in-session fast path) the pass reads
        # them instead of the checkpoint parquet.
        metric_cols = ["hit_rule_ids", "error", "n_missing", "kind"]
        sink_complete = wave1_partials is not None and (
            not have_miss_rows or wave2_partials is not None
        )
        if sink_complete:
            # every contributing wave ran in-session with a metrics
            # sink: the partials were counted by the write tasks
            # themselves — no extra read pass at all
            merged = dict(wave1_partials)
            for k, n in (wave2_partials or {}).items():
                merged[k] = merged.get(k, 0) + n
        else:
            if inmem_wave1 is not None and (
                not have_miss_rows or inmem_wave2 is not None
            ):
                partial_src = inmem_wave1.filter(
                    expr="refit == 0"
                ).select_columns(metric_cols)
                if inmem_wave2 is not None:
                    partial_src = partial_src.union(
                        inmem_wave2.select_columns(metric_cols)
                    )
            else:
                partial_src = ray.data.read_parquet(
                    _answer_files(answer_dirs), columns=metric_cols
                )
            partials = partial_src.map_batches(
                answer_partials, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
            merged = {}
            for r in partials:
                merged[r["key"]] = merged.get(r["key"], 0) + r["n"]
        store.apply_hits({
            int(k.split(":", 1)[1]): v
            for k, v in merged.items() if k.startswith("hit:")
        })
        store.save(store_path, merge=True)
        metrics = {
            k.split(":", 1)[1]: v
            for k, v in sorted(merged.items()) if k.startswith("metric:")
        }
        # per-partition lineage: the files each wave contributed
        partitions = {
            d: sorted(os.listdir(d)) for d in answer_dirs if os.path.isdir(d)
        }
        if metrics.get("rows"):
            # the reference's cache-hit-rate analog (src/metrics.py:83-177)
            metrics["fast_path_hit_rate"] = round(
                1.0 - metrics.get("miss_rows", 0) / metrics["rows"], 6
            )
            # run-cost accounting — the deterministic analog of the
            # reference's per-run time/cost report (src/metrics.py:
            # 83-177; there: LLM tokens and dollars, here: wall time and
            # throughput — this engine's marginal cost per doc is CPU
            # seconds, not API spend)
            elapsed = time.time() - t0
            metrics["wall_s"] = round(elapsed, 3)
            metrics["docs_per_sec"] = round(metrics["rows"] / max(elapsed, 1e-9), 1)
        stats["metrics"] = metrics
        # corpus-level drift ledger: one JSONL record per run next to the
        # rule store, so successive runs over a corpus can be compared
        # (hit-rate regressions, error spikes, rule growth)
        try:
            with open(store_path + ".history.jsonl", "a") as hf:
                hf.write(json.dumps({
                    "ts": time.time(),
                    "work_dir": work_dir,
                    "rules_fitted": fitted_rows,
                    "rules_total": len(store),
                    **metrics,
                }) + "\n")
        except OSError:
            pass  # ledger is best-effort
        # ...and the queryable parquet form keyed by (run_id, wave):
        # one file per run under <store>.ledger/ (idempotent rewrite on
        # resume), consumed by the `ledger_drift` registry entry
        try:
            from ..state import ledger as _ledger

            def _wave_rows(partials):
                return {
                    k.split(":", 1)[1]: v
                    for k, v in (partials or {}).items()
                    if k.startswith("metric:")
                }

            waves = {"total": {
                **metrics,
                "rules_fitted": fitted_rows,
                "rules_total": len(store),
                "wall_ms": int(metrics.get("wall_s", 0) * 1000),
            }}
            if wave1_partials is not None:
                waves["wave1"] = _wave_rows(wave1_partials)
            if wave2_partials is not None:
                waves["wave2"] = _wave_rows(wave2_partials)
            _ledger.append_run(
                store_path + ".ledger",
                run_id=os.path.basename(os.path.normpath(work_dir)),
                seq=int(time.time() * 1000),
                waves=waves,
            )
        except OSError:
            pass  # ledger is best-effort
        with open(os.path.join(work_dir, "metrics.json"), "w") as f:
            json.dump(
                {
                    "metrics": metrics,
                    "rules_fitted": fitted_rows,
                    "rules_total": len(store),
                    "answer_dirs": answer_dirs,
                    "partitions": partitions,
                    "store_path": store_path,
                },
                f, indent=2,
            )
        # marker LAST: hits are folded exactly once even across crashes
        # (worst case a crash before this line re-folds on resume, but a
        # completed run never double-counts)
        with open(hits_done, "w") as f:
            f.write(json.dumps({"ts": time.time()}))
    phases["hits_metrics"] = time.time() - t0 - sum(phases.values())

    if report is not None and "metrics" in stats:
        try:  # external sink must never fail the run
            report({
                "work_dir": work_dir,
                "rules_fitted": fitted_rows,
                "rules_total": len(store),
                "phases": dict(phases),
                **stats["metrics"],
            })
        except Exception:
            pass

    stats.update(
        {
            "answers": answers,
            "store_path": store_path,
            "rules_total": len(store),
            "wall_s": time.time() - t0,
        }
    )
    return stats


# above this many ground-truth rows, evaluate_accuracy swaps its
# broadcast expected-table for a distributed hash join on url — the
# same size-routing discipline as every small-side lookup here
EVAL_BROADCAST_MAX = 200_000


def _score_pairs(urls, got, want_jsons):
    accs, matches, totals = [], [], []
    for g, w in zip(got, want_jsons):
        want: dict = json.loads(w)
        ans = json.loads(g) if g else {}
        ok = sum(
            1 for k, v in want.items()
            if ans.get(k, None) == (None if v is None else v)
        )
        matches.append(ok)
        totals.append(len(want))
        accs.append(ok / len(want) if want else 1.0)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "n_match": pa.array(matches, pa.int64()),
            "n_expected": pa.array(totals, pa.int64()),
            "accuracy": pa.array(accs, pa.float64()),
        }
    )


def evaluate_accuracy(
    answers: ray.data.Dataset, expected: ray.data.Dataset
) -> dict[str, float]:
    """Exact-match accuracy vs ground truth — ``evaluate_performance``
    semantics (``/root/reference/src/metrics.py:255-289``): per doc, the
    fraction of expected fields whose extracted value matches exactly
    (None == null); corpus accuracy is the mean.

    Size-routed: while the ground-truth table fits EVAL_BROADCAST_MAX
    it ships once via ray.put and each answer batch scores against the
    in-memory index; beyond it, answers ⋈ expected run through a
    distributed hash join on url (safe_join) and scoring happens per
    joined batch — no driver-side or broadcast copy of a corpus-scale
    truth set. Both routes are equivalence-tested
    (tests/test_round5_fixes.py::TestEvaluateRoutes)."""
    # pool must leave CPUs for the read tasks — a pool that reserves every
    # core of a small session deadlocks the pipeline
    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    expected = expected.materialize()
    if expected.count() > EVAL_BROADCAST_MAX:
        from ..stages.joins import safe_join

        joined = safe_join(
            answers.select_columns(["url", "extracted_json"]),
            expected.select_columns(["url", "expected_norm_json"]),
            on=("url",), join_type="inner",
            broadcast_max=0,  # this route exists to avoid the broadcast
        )

        def score_joined(batch: pa.Table) -> pa.Table:
            return _score_pairs(
                batch["url"].to_pylist(),
                batch["extracted_json"].to_pylist(),
                batch["expected_norm_json"].to_pylist(),
            )

        scored = joined.map_batches(score_joined, batch_format="pyarrow")
    else:
        exp_df = expected.to_pandas().set_index("url")
        exp_ref = ray.put(exp_df)

        class Score:
            def __init__(self, ref):
                self.exp = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                urls = batch["url"].to_pylist()
                want = [
                    self.exp.loc[u]["expected_norm_json"] for u in urls
                ]
                return _score_pairs(
                    urls, batch["extracted_json"].to_pylist(), want
                )

        scored = answers.map_batches(
            Score, fn_constructor_args=(exp_ref,), batch_format="pyarrow",
            concurrency=max(1, min(4, n_cpus - 2)),
        )
    agg = scored.aggregate(
        ray.data.aggregate.Sum("n_match"),
        ray.data.aggregate.Sum("n_expected"),
        ray.data.aggregate.Mean("accuracy"),
    )
    return {
        "field_accuracy": agg["sum(n_match)"] / max(1, agg["sum(n_expected)"]),
        "doc_accuracy": agg["mean(accuracy)"],
    }
