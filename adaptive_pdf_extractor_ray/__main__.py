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
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_extract(args: argparse.Namespace) -> int:
    ray = _ray_session(args.num_cpus)
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

    res = extract_pages(
        rd.read_parquet(source),
        work_dir,
        store_path=args.store,
        concurrency=args.concurrency,
        batch_size=args.batch_size,
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
    ray.shutdown()
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    ray = _ray_session(args.num_cpus)
    from .sources.synthetic import write_corpus

    pages_dir, exp_dir = write_corpus(
        args.out, n=args.docs, seed=args.seed, shard_rows=args.shard_rows,
        filler_words=args.filler_words,
    )
    print(json.dumps({"pages": pages_dir, "expected": exp_dir}))
    ray.shutdown()
    return 0


def cmd_evaluate(args: argparse.Namespace) -> int:
    ray = _ray_session(args.num_cpus)
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
    pe.set_defaults(fn=cmd_extract)

    ps = sub.add_parser("synth", help="generate a synthetic pages corpus")
    ps.add_argument("--out", required=True)
    ps.add_argument("--docs", type=int, required=True)
    ps.add_argument("--seed", type=int, default=1)
    ps.add_argument("--shard-rows", type=int, default=10_000)
    ps.add_argument("--filler-words", type=int, default=0)
    ps.add_argument("--num-cpus", type=int, default=None)
    ps.set_defaults(fn=cmd_synth)

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
