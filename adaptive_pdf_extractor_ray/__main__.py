"""CLI entry point — the rebuild of the reference's ``src/main.py`` CLI
(``/root/reference/src/main.py:53-119,416-426``, tyro-based) with stdlib
argparse. Owns its own Ray session (guarded), unlike the library code.

    python -m adaptive_pdf_extractor_ray extract \
        --input /path/to/pages_parquet --work-dir /tmp/run1 \
        [--store rules.parquet] [--num-cpus 32] [--batch-size 2048]

    python -m adaptive_pdf_extractor_ray synth \
        --out /tmp/corpus --docs 10000 [--seed 1] [--filler-words 0]

    python -m adaptive_pdf_extractor_ray evaluate \
        --answers-work-dir /tmp/run1 --expected /path/to/expected_parquet
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys


def _ray_session(num_cpus: int | None):
    """Returns (ray, owns_session): shutdown only a session we started —
    an embedding caller's (or the test fixture's) session is left alone."""
    import os

    import ray

    owns = not ray.is_initialized()
    if owns:
        # under `ray job submit` the job runtime exports RAY_ADDRESS and
        # the CLI attaches to the running cluster; standalone it starts a
        # local session
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray, owns


def cmd_extract(args: argparse.Namespace) -> int:
    ray, owns_session = _ray_session(args.num_cpus)
    import glob
    import os

    import ray.data as rd

    from .pipelines.extract import extract_pages

    source = args.input
    work_dir = args.work_dir
    if args.num_shards > 1:
        # shard by input file: each shard is an independent, resumable
        # unit (own work dir + _done markers) — the multi-node work
        # partitioning described in SCALING.md
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet"))) or [
            args.input
        ]
        source = files[args.shard :: args.num_shards]
        if not source:
            print(json.dumps({"rows": 0, "note": "shard has no input files"}))
            ray.shutdown()
            return 0
        work_dir = os.path.join(args.work_dir, f"shard={args.shard:05d}")

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    res = extract_pages(
        rd.read_parquet(source),
        work_dir,
        store_path=args.store,
        concurrency=max(1, min(args.concurrency, n_cpus - 2)),
        batch_size=args.batch_size,
        pdf_layout=args.pdf_layout,
        oversize_bytes=args.oversize_bytes,
    )
    summary = {
        "rows": res["answers"].count(),
        "rules_fitted": res["rules_fitted"],
        "rules_total": res["rules_total"],
        "store_path": res["store_path"],
        "answer_dirs": res["answer_dirs"],
        "wall_s": round(res["wall_s"], 3),
        "phases": {k: round(v, 3) for k, v in res["phases"].items()},
    }
    if "metrics" in res:
        summary["metrics"] = res["metrics"]
    from .state.rulestore import RuleStore

    summary["rule_counts"] = RuleStore.load(res["store_path"]).counts()
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_watch(args: argparse.Namespace) -> int:
    """Incremental corpus ingestion: poll --input for parquet shards that
    have not been processed yet; run extraction over each new batch into
    its own resumable sub-work-dir, all sharing one rule store (safe —
    the store save is lock + delta-merge). Stops when an ``_COMPLETE``
    sentinel file appears in the input dir and everything is ingested,
    after ``--max-polls`` empty polls, or immediately with ``--once``.
    The processed-set ledger (``ingested.json``) makes the watcher itself
    resumable."""
    ray, owns_session = _ray_session(args.num_cpus)
    import glob
    import os
    import time as _time

    import ray.data as rd

    from .pipelines.extract import extract_pages

    # never size the actor pool to (or past) the whole session — a pool
    # that reserves every core deadlocks against the read/write tasks
    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    concurrency = max(1, min(args.concurrency, n_cpus - 2))

    os.makedirs(args.work_dir, exist_ok=True)
    ledger_path = os.path.join(args.work_dir, "ingested.json")
    store_path = args.store or os.path.join(args.work_dir, "rules.parquet")
    seen: list[str] = []
    if os.path.exists(ledger_path):
        with open(ledger_path) as f:
            seen = json.load(f)
    batches = 0
    rows = 0
    empty_polls = 0
    failures = 0
    prev_sizes: dict[str, int] = {}
    attempts: dict[str, int] = {}  # per-file failed-batch count

    def extract_batch(file_list: list[str]) -> int:
        """One resumable batch over an explicit file set -> row count.

        The sub-work-dir is keyed by the md5 of the FILE LIST, not the
        ledger length: if a crash left a half-finished batch and the set
        of pending files changed by restart, a fresh work dir is used —
        a stale wave1._done marker can never silently skip files that
        were not in the original batch. The list is also persisted as a
        manifest inside the work dir (lineage / debugging)."""
        batch_key = hashlib.md5(
            "\n".join(file_list).encode("utf-8")
        ).hexdigest()[:16]
        wd = os.path.join(args.work_dir, f"ingest-{batch_key}")
        os.makedirs(wd, exist_ok=True)
        manifest = os.path.join(wd, "files.json")
        if not os.path.exists(manifest):
            with open(manifest + ".tmp", "w") as f:
                json.dump(file_list, f)
            os.replace(manifest + ".tmp", manifest)
        res = extract_pages(
            rd.read_parquet(file_list), wd, store_path=store_path,
            concurrency=concurrency, batch_size=args.batch_size,
        )
        return res["answers"].count()

    while True:
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        sizes = {}
        for f in files:
            try:
                sizes[f] = os.path.getsize(f)
            except OSError:
                continue  # vanished between glob and stat
        # write-completeness: a shard still being copied when polled would
        # fail the whole batch — only take files whose size is unchanged
        # since the previous poll (producers without atomic renames are
        # picked up one poll later; with --once everything visible is
        # taken, matching the single-pass contract). Files that failed
        # --max-retries batches are quarantined: retried no further,
        # never ledgered, reported at exit.
        seen_set = set(seen)
        pending = [
            f for f in sizes
            if f not in seen_set and attempts.get(f, 0) < args.max_retries
        ]
        new = [
            f for f in pending
            if args.once or prev_sizes.get(f) == sizes[f]
        ]
        prev_sizes = sizes
        if new:
            empty_polls = 0
            ok_files: list[str] = []
            try:
                rows += extract_batch(new)
                ok_files = new
                batches += 1
            except Exception:
                # a bad shard must not kill the watcher or poison its
                # batch-mates: isolate the failure per file
                for f in new:
                    try:
                        rows += extract_batch([f])
                        ok_files.append(f)
                        batches += 1
                    except Exception as e:
                        failures += 1
                        attempts[f] = attempts.get(f, 0) + 1
                        print(json.dumps({
                            "warn": "shard failed; left out of ledger",
                            "error": str(e)[:500], "file": f,
                            "attempts": attempts[f],
                        }), file=sys.stderr)
            if ok_files:
                seen.extend(ok_files)
                tmp = ledger_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(seen, f)
                os.replace(tmp, ledger_path)
        else:
            empty_polls += 1
        done = (
            os.path.exists(os.path.join(args.input, "_COMPLETE"))
            and not pending  # includes files deferred by the size gate
        )
        if args.once or done or (args.max_polls and empty_polls >= args.max_polls):
            break
        _time.sleep(args.poll_s)
    print(json.dumps({
        "batches": batches, "files_ingested": len(seen), "rows": rows,
        "failures": failures,
        "quarantined": sorted(
            f for f in attempts if attempts[f] >= args.max_retries
        ),
        "store_path": store_path,
    }))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    ray, owns_session = _ray_session(args.num_cpus)
    from .sources.synthetic import write_corpus

    pages_dir, exp_dir = write_corpus(
        args.out, n=args.docs, seed=args.seed, shard_rows=args.shard_rows,
        filler_words=args.filler_words,
    )
    print(json.dumps({"pages": pages_dir, "expected": exp_dir}))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_evaluate(args: argparse.Namespace) -> int:
    ray, owns_session = _ray_session(args.num_cpus)
    import os

    import ray.data as rd

    from .pipelines.extract import evaluate_accuracy

    dirs = list(args.answer_dirs or [])
    if args.work_dir:  # shorthand: derive answer dirs from the work dir
        for d in (
            os.path.join(args.work_dir, "wave1", "refit=0"),
            os.path.join(args.work_dir, "wave2"),
        ):
            if os.path.isdir(d):
                dirs.append(d)
    if not dirs:
        print(json.dumps({"error": "no answer dirs (pass --answer-dirs or --work-dir)"}))
        return 2
    # expand dirs to files: paths containing hive-style segments (shard=NNN)
    # confuse read_parquet's directory resolution for multi-dir lists
    import glob as _glob

    files: list[str] = []
    for d in dirs:
        files.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))) or [d])
    answers = rd.read_parquet(files)
    acc = evaluate_accuracy(answers, rd.read_parquet(args.expected))
    print(json.dumps({k: round(v, 6) for k, v in acc.items()}))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """Training-data curation over a directory holding documents.parquet
    (doc_id/text [+lang/source/n_chars]): quality gate -> language gate ->
    exact dedup, plus MinHash-LSH near-dup keep-best with ``--near-dup``.
    Survivor rows (with text re-attached via a hash join sized to the
    survivor count) stream to ``--out`` as zstd parquet."""
    ray, owns_session = _ray_session(args.num_cpus)
    import os

    import ray.data as rd

    from .pipelines.queries import QUERIES, _table_rows
    from .stages import dedup as dd

    chain = "curate_neardup" if args.near_dup else "curate_documents"
    if getattr(args, "work_dir", None) and args.near_dup:
        # stage-boundary checkpoints + _done-marker resume: a rerun
        # with the same --work-dir skips completed stages (the
        # multi-day-run protocol; pipelines/curate.py)
        from .pipelines.curate import curate_neardup_checkpointed

        _ck_stats: dict = {}
        survivors = curate_neardup_checkpointed(
            args.input, args.work_dir, stats_out=_ck_stats
        )
        chain = "curate_neardup[ckpt]"
    else:
        survivors = QUERIES[chain](args.input)
    docs = rd.read_parquet(os.path.join(args.input, "documents.parquet"))
    n_in = _table_rows(args.input, "documents")
    out = survivors.join(
        docs, join_type="inner",
        num_partitions=dd.adaptive_partitions(n_in),
        on=("doc_id",),
    )
    if getattr(args, "lm_max_bits", None) is not None:
        # CCNet-style perplexity gate: unigram model fit on the input
        # corpus; docs whose mean per-token code length exceeds the
        # budget (atypical/mash text scores high) are dropped
        lm_keep = (
            QUERIES["lm_score"](args.input)
            .filter(expr=f"lm_bits <= {float(args.lm_max_bits)!r}")
            .select_columns(["doc_id"])
        )
        out = out.join(
            lm_keep, join_type="inner",
            num_partitions=dd.adaptive_partitions(n_in),
            on=("doc_id",),
        )
        chain += "+lm"
    out.write_parquet(args.out, compression="zstd")
    n_kept = rd.read_parquet(args.out).count()
    rec = {
        "chain": chain, "rows_in": n_in, "rows_kept": n_kept,
        "out": args.out,
    }
    if getattr(args, "work_dir", None) and args.near_dup:
        # per-stage lineage (rows + completion ts) from the markers
        rec["lineage"] = _ck_stats.get("lineage", [])
    print(json.dumps(rec))
    if owns_session:
        ray.shutdown()
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run any registered named pipeline over a table directory and
    stream the result to parquet (or print a head sample): the
    switch-from-the-reference entry point for every operator in
    ``pipelines/queries.py``. ``query list`` enumerates the registry."""
    if args.name == "list":
        from .pipelines.queries import QUERIES

        print(json.dumps(sorted(QUERIES)))
        return 0
    ray, owns_session = _ray_session(args.num_cpus)
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from .pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(json.dumps({"error": f"unknown query {args.name!r} "
                          f"(try: query list)"}))
        return 2
    res = QUERIES[args.name](args.sf_dir)
    if args.out:
        if isinstance(res, pa.Table):
            res = rd.from_arrow(res)
        elif isinstance(res, pd.DataFrame):
            res = rd.from_pandas(res)
        res.write_parquet(args.out, compression="zstd")
        n = rd.read_parquet(args.out).count()
        print(json.dumps({"query": args.name, "rows": n, "out": args.out}))
    else:
        if isinstance(res, rd.Dataset):
            df = res.limit(args.head).to_pandas()
        elif isinstance(res, pa.Table):
            df = res.slice(0, args.head).to_pandas()
        else:
            df = res.head(args.head)
        print(df.to_string())
    if owns_session:
        ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="adaptive_pdf_extractor_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction pipeline")
    pe.add_argument("--input", required=True)
    pe.add_argument("--work-dir", required=True)
    pe.add_argument("--store", default=None)
    pe.add_argument("--num-cpus", type=int, default=None)
    pe.add_argument("--concurrency", type=int, default=8)
    pe.add_argument("--batch-size", type=int, default=2048)
    pe.add_argument("--shard", type=int, default=0,
                    help="this worker's shard index (input-file striping)")
    pe.add_argument("--num-shards", type=int, default=1,
                    help="total shards; >1 makes work-dir per shard")
    pe.add_argument("--oversize-bytes", type=int, default=None,
                    help="route rows with payload over this many bytes "
                    "through a batch_size=1 branch (skew guard for "
                    "giant PDFs mixed into a ~2KB-page corpus)")
    pe.add_argument("--pdf-layout", choices=["linear", "grid"],
                    default="linear",
                    help="'grid' extracts detached-header card PDFs from "
                         "positional runs (labels and values on separate "
                         "x-aligned lines)")
    pe.set_defaults(fn=cmd_extract)

    pw = sub.add_parser(
        "watch", help="incremental ingestion: extract new input shards as they appear"
    )
    pw.add_argument("--input", required=True)
    pw.add_argument("--work-dir", required=True)
    pw.add_argument("--store", default=None)
    pw.add_argument("--num-cpus", type=int, default=None)
    pw.add_argument("--concurrency", type=int, default=8)
    pw.add_argument("--batch-size", type=int, default=2048)
    pw.add_argument("--poll-s", type=float, default=5.0)
    pw.add_argument("--once", action="store_true",
                    help="one ingestion pass, then exit")
    pw.add_argument("--max-polls", type=int, default=0,
                    help="exit after N consecutive empty polls (0 = never)")
    pw.add_argument("--max-retries", type=int, default=3,
                    help="quarantine a shard after N failed batches "
                         "(never ledgered; reported at exit)")
    pw.set_defaults(fn=cmd_watch)

    ps = sub.add_parser("synth", help="generate a synthetic pages corpus")
    ps.add_argument("--out", required=True)
    ps.add_argument("--docs", type=int, required=True)
    ps.add_argument("--seed", type=int, default=1)
    ps.add_argument("--shard-rows", type=int, default=10_000)
    ps.add_argument("--filler-words", type=int, default=0)
    ps.add_argument("--num-cpus", type=int, default=None)
    ps.set_defaults(fn=cmd_synth)

    pc_ = sub.add_parser(
        "curate",
        help="quality/lang/dedup curation over a documents.parquet dir",
    )
    pc_.add_argument("--input", required=True,
                     help="directory holding documents.parquet")
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--near-dup", action="store_true",
                     help="also run MinHash-LSH near-dup keep-best")
    pc_.add_argument("--lm-max-bits", type=float, default=None,
                     help="drop docs whose unigram-LM mean code length "
                          "exceeds this budget (CCNet-style gate)")
    pc_.add_argument("--work-dir", default=None,
                     help="with --near-dup: checkpoint each chain stage "
                          "here and resume completed stages on rerun")
    pc_.add_argument("--num-cpus", type=int, default=None)
    pc_.set_defaults(fn=cmd_curate)

    pq = sub.add_parser(
        "query",
        help="run a registered named pipeline (or 'list') over a table dir",
    )
    pq.add_argument("name")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pq.add_argument("--out", default=None,
                    help="write result parquet here (else print a head)")
    pq.add_argument("--head", type=int, default=20)
    pq.add_argument("--num-cpus", type=int, default=None)
    pq.set_defaults(fn=cmd_query)

    pv = sub.add_parser("evaluate", help="score answers vs expected")
    pv.add_argument("--answer-dirs", nargs="+", default=None)
    pv.add_argument("--work-dir", default=None,
                    help="derive answer dirs from an extract work dir")
    pv.add_argument("--expected", required=True)
    pv.add_argument("--num-cpus", type=int, default=None)
    pv.set_defaults(fn=cmd_evaluate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
