"""Bounded-memory streaming proof (round-4 VERDICT item 5).

Single-node stand-in for the 100 TB claim in SCALING.md: run the
flagship extraction pipeline and the LSH dedup chain against an input
severalfold larger than a DELIBERATELY constrained object store
(default 2 GiB), and show that

  1. both complete without OOM (the streaming executor's backpressure
     bounds the in-flight working set; overflow spills),
  2. outputs are IDENTICAL to an unconstrained run (spill/restore is
     transparent to the dataflow),
  3. peak object-store usage stays at the cap, with the overflow in
     the spill counters — i.e. the topology never requires the whole
     corpus resident, which is precisely what "streams 100 TB through
     a fixed-size cluster" needs.

Usage:
    python scripts/bounded_memory_proof.py [--docs 800000]
        [--store-gb 2.0] [--dedup-docs 500000]

Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class StoreSampler:
    """Background sampler of object-store usage (cluster minus
    available resource accounting) and spill-directory bytes
    (`<session_dir>/ray_spilled_objects_*`) — the grpc-free public
    surfaces for 'how full did plasma get, how much overflowed'."""

    def __init__(self, session_dir: str, period_s: float = 0.25):
        import threading

        self.session_dir = session_dir
        self.period_s = period_s
        self.peak_store = 0
        self.spill_bytes = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _sample(self) -> None:
        import ray

        try:
            total = ray.cluster_resources().get("object_store_memory", 0)
            avail = ray.available_resources().get(
                "object_store_memory", 0
            )
            self.peak_store = max(self.peak_store, int(total - avail))
        except Exception:
            pass
        spilled = 0
        try:
            for d in os.listdir(self.session_dir):
                if d.startswith("ray_spilled_objects"):
                    p = os.path.join(self.session_dir, d)
                    for f in os.listdir(p):
                        try:
                            spilled += os.path.getsize(
                                os.path.join(p, f)
                            )
                        except OSError:
                            pass
        except OSError:
            pass
        # spill files are deleted as refs release: track the high-water
        self.spill_bytes = max(self.spill_bytes, spilled)

    def _run(self) -> None:
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(self.period_s)

    def __enter__(self) -> "StoreSampler":
        self._t.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._t.join(timeout=5)
        self._sample()

    def stats(self) -> dict:
        return {
            "peak_store_mib": self.peak_store >> 20,
            "spilled_mib": self.spill_bytes >> 20,
        }


def _answers_digest(answer_dirs: list[str]) -> tuple[int, str]:
    """Order-insensitive value digest of the extracted answers."""
    import pyarrow.dataset as pads

    rows = 0
    h = 0
    for d in answer_dirs:
        t = pads.dataset(d).to_table(
            columns=["url", "extracted_json", "n_missing"]
        )
        rows += t.num_rows
        for u, e, n in zip(
            t["url"].to_pylist(),
            t["extracted_json"].to_pylist(),
            t["n_missing"].to_pylist(),
        ):
            h ^= int.from_bytes(
                hashlib.md5(
                    f"{u}\x00{e}\x00{n}".encode()
                ).digest()[:8],
                "big",
            )
    return rows, f"{h:016x}"


def run_flagship(pages_dir: str, num_cpus: int,
                 object_store_bytes: int | None) -> dict:
    import ray

    ctx = ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
        **({"object_store_memory": object_store_bytes}
           if object_store_bytes else {}),
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages

    work = tempfile.mkdtemp(prefix="aper_bmem_")
    t0 = time.time()
    with StoreSampler(ctx.address_info["session_dir"]) as smp:
        res = extract_pages(
            rd.read_parquet(pages_dir), work,
            concurrency=max(2, num_cpus * 3 // 4),
            batch_size=2048, write_answers=True,
        )
        res["answers"].count()
    wall = time.time() - t0
    rows, digest = _answers_digest(res["answer_dirs"])
    ray.shutdown()
    shutil.rmtree(work, ignore_errors=True)
    return {"wall_s": round(wall, 3), "rows": rows,
            "digest": digest, "metrics_errors":
                res["metrics"].get("errors"), **smp.stats()}


def run_lsh_chain(sf_dir: str, num_cpus: int,
                  object_store_bytes: int | None) -> dict:
    import ray

    ctx = ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
        **({"object_store_memory": object_store_bytes}
           if object_store_bytes else {}),
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from adaptive_pdf_extractor_ray.pipelines.queries import (
        _lsh_distinct_pairs,
    )

    t0 = time.time()
    with StoreSampler(ctx.address_info["session_dir"]) as smp:
        pairs = _lsh_distinct_pairs(sf_dir).materialize()
        n_pairs = pairs.count()
        # order-insensitive pair digest
        h = 0
        for b in pairs.iter_batches(batch_format="pyarrow"):
            for a, bb in zip(b["a"].to_pylist(), b["b"].to_pylist()):
                h ^= int.from_bytes(
                    hashlib.md5(f"{a}-{bb}".encode()).digest()[:8],
                    "big",
                )
    wall = time.time() - t0
    ray.shutdown()
    return {"wall_s": round(wall, 3), "pairs": n_pairs,
            "digest": f"{h:016x}", **smp.stats()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=800_000)
    ap.add_argument("--dedup-docs", type=int, default=500_000)
    ap.add_argument("--store-gb", type=float, default=2.0)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--filler-words", type=int, default=120,
                    help="pad synthetic docs so the corpus dwarfs the "
                         "constrained store")
    args = ap.parse_args()

    # corpus (written once; a throwaway Ray session parallelizes the
    # order-free shard generation — sequential writing of an 800k-doc
    # corpus is minutes of single-core work)
    import ray

    from adaptive_pdf_extractor_ray.sources.synthetic import write_corpus

    corpus_dir = os.path.join(
        tempfile.gettempdir(),
        f"aper_bmem_corpus_{args.docs}_{args.filler_words}",
    )
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    pages_dir, _ = write_corpus(
        corpus_dir, n=args.docs, seed=1, shard_rows=5000,
        filler_words=args.filler_words,
    )
    ray.shutdown()
    input_bytes = sum(
        os.path.getsize(os.path.join(pages_dir, f))
        for f in os.listdir(pages_dir)
    )

    cap = int(args.store_gb * (1 << 30))
    out: dict = {
        "metric": "bounded-memory streaming proof",
        "docs": args.docs,
        "input_mib": input_bytes >> 20,
        "object_store_cap_mib": cap >> 20,
        "num_cpus": args.num_cpus,
    }

    out["flagship_unconstrained"] = run_flagship(
        pages_dir, args.num_cpus, None
    )
    out["flagship_capped"] = run_flagship(pages_dir, args.num_cpus, cap)
    out["flagship_identical"] = (
        out["flagship_unconstrained"]["rows"]
        == out["flagship_capped"]["rows"]
        and out["flagship_unconstrained"]["digest"]
        == out["flagship_capped"]["digest"]
    )

    # LSH chain over the adversarial dedup corpus
    import bench

    dd_dir = bench._write_dedup_corpus(
        os.path.join(tempfile.gettempdir(),
                     f"aper_dedup_{args.dedup_docs}"),
        args.dedup_docs,
    )
    out["lsh_unconstrained"] = run_lsh_chain(dd_dir, args.num_cpus, None)
    out["lsh_capped"] = run_lsh_chain(dd_dir, args.num_cpus, cap)
    out["lsh_identical"] = (
        out["lsh_unconstrained"]["pairs"] == out["lsh_capped"]["pairs"]
        and out["lsh_unconstrained"]["digest"]
        == out["lsh_capped"]["digest"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
