"""Cross-run metrics ledger — a corpus-level parquet history table.

ROADMAP item 6 / round-4 VERDICT item 6: every extraction run appends
its per-wave metrics rows to ``<ledger_dir>/run-<id>.parquet``, keyed
by ``(run_id, wave)``, so successive runs over a corpus are comparable
(hit-rate regressions, error spikes, rule growth) by a plain dataflow
instead of by eyeballing ``metrics.json`` files. One small file per run
keeps appends lock-free and idempotent (a resumed run rewrites its own
file byte-identically; no read-modify-write on shared state — the same
crash-safety stance as the answer-partition ``_done`` markers,
``pipelines/extract.py``).

The ``ledger_drift`` registry entry consumes this table and joins each
run to its predecessor on ``seq`` (a seq -> seq-1 self-join — the
window-free LAG idiom, same family as q_event_lag), DuckDB-verified
against the real ``lag()`` window function.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

LEDGER_FIELDS = [
    ("run_id", pa.string()),
    ("seq", pa.int64()),       # monotone run sequence (caller-supplied)
    ("wave", pa.string()),     # "wave1" | "wave2" | "total"
    ("rows", pa.int64()),
    ("errors", pa.int64()),
    ("miss_rows", pa.int64()),
    ("rules_fitted", pa.int64()),
    ("rules_total", pa.int64()),
    ("wall_ms", pa.int64()),
]
LEDGER_SCHEMA = pa.schema(LEDGER_FIELDS)


def append_run(ledger_dir: str, run_id: str, seq: int,
               waves: dict[str, dict]) -> str:
    """Write this run's metrics rows as one parquet file.

    ``waves`` maps wave name -> metric dict (missing keys default 0).
    Idempotent: the same (run_id, waves) rewrites the same file with the
    same content — a crashed-and-resumed run cannot double-append."""
    os.makedirs(ledger_dir, exist_ok=True)
    rows = {name: [] for name, _ in LEDGER_FIELDS}
    for wave in sorted(waves):
        m = waves[wave]
        rows["run_id"].append(run_id)
        rows["seq"].append(int(seq))
        rows["wave"].append(wave)
        for k in ("rows", "errors", "miss_rows", "rules_fitted",
                  "rules_total", "wall_ms"):
            rows[k].append(int(m.get(k, 0)))
    # NOT `run_id=<id>.parquet`: a `k=v` path segment triggers hive
    # partition autodetection in DuckDB (and Ray), which would override
    # the file's own run_id column with the filename remainder
    path = os.path.join(ledger_dir, f"run-{run_id}.parquet")
    tmp = path + ".tmp"
    pq.write_table(
        pa.table({n: pa.array(v, t) for (n, t), v in
                  zip(LEDGER_FIELDS, rows.values())}),
        tmp, compression="zstd",
    )
    os.replace(tmp, path)  # atomic publish
    return path
