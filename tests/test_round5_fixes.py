"""Round-5 additions: cross-run parquet metrics ledger (ROADMAP item 6)
and its drift query."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from adaptive_pdf_extractor_ray.state import ledger as lg


class TestLedgerWriter:
    def test_append_and_schema(self, tmp_path):
        p = lg.append_run(
            str(tmp_path), "runA", 1,
            {"wave1": {"rows": 10, "errors": 1, "wall_ms": 5},
             "total": {"rows": 12, "miss_rows": 2}},
        )
        t = pq.read_table(p)
        assert t.schema.equals(lg.LEDGER_SCHEMA)
        assert t.num_rows == 2  # one row per wave, sorted by wave name
        d = t.to_pydict()
        assert d["wave"] == ["total", "wave1"]
        assert d["rows"] == [12, 10]
        assert d["errors"] == [0, 1]  # missing keys default 0

    def test_idempotent_rewrite(self, tmp_path):
        a = lg.append_run(str(tmp_path), "r", 7, {"total": {"rows": 5}})
        first = open(a, "rb").read()
        b = lg.append_run(str(tmp_path), "r", 7, {"total": {"rows": 5}})
        assert a == b
        assert open(b, "rb").read() == first  # byte-identical rewrite
        assert len(os.listdir(tmp_path)) == 1  # no double-append

    def test_no_hive_partition_filename(self, tmp_path):
        # `run_id=<id>.parquet` would trigger hive autodetection in
        # DuckDB/Ray and override the column with the filename remainder
        p = lg.append_run(str(tmp_path), "x", 0, {"total": {}})
        assert "=" not in os.path.basename(p)


class TestLedgerDrift:
    def test_matches_duckdb_lag(self, ray_session):
        import duckdb

        from adaptive_pdf_extractor_ray.pipelines import queries as q

        got = (
            q.q_ledger_drift("unused")
            .to_pandas()
            .sort_values("seq")
            .reset_index(drop=True)
        )
        want = duckdb.sql(q.ledger_drift_oracle_sql()).df() \
            .sort_values("seq").reset_index(drop=True)
        assert (got["run_id"] == want["run_id"]).all()
        for c in ("rows", "d_rows", "d_errors", "d_miss"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_error_spike_is_visible(self, ray_session):
        """The fixture injects an error spike at run 3; the drift table
        must surface it as +26 then -26 — the alerting signal."""
        from adaptive_pdf_extractor_ray.pipelines import queries as q

        got = q.q_ledger_drift("unused").to_pandas().set_index("seq")
        assert got.loc[3, "d_errors"] == 26
        assert got.loc[4, "d_errors"] == -26
        assert len(got) == q.LEDGER_RUNS - 1  # first run has no prev


class TestExtractWritesLedger:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("ledcorp")
        r = subprocess.run(
            [sys.executable, "-m", "adaptive_pdf_extractor_ray", "synth",
             "--out", str(d), "--docs", "120", "--seed", "3",
             "--num-cpus", "2"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        return str(d)

    def test_two_runs_two_ledger_files(self, corpus, tmp_path):
        """The flagship appends one parquet per run next to the rule
        store; a second run (new work dir, shared store) adds a second
        file keyed by its own run_id."""
        outs = []
        for i in (1, 2):
            wd = str(tmp_path / f"run{i}")
            r = subprocess.run(
                [sys.executable, "-m", "adaptive_pdf_extractor_ray",
                 "extract", "--input", os.path.join(corpus, "pages"),
                 "--work-dir", wd, "--num-cpus", "2",
                 "--concurrency", "1",
                 "--store", str(tmp_path / "rules.parquet")],
                capture_output=True, text=True, timeout=300,
            )
            assert r.returncode == 0, r.stderr[-1500:]
            outs.append(json.loads(r.stdout.strip().splitlines()[-1]))
        led = str(tmp_path / "rules.parquet.ledger")
        files = sorted(os.listdir(led))
        assert len(files) == 2
        t = pq.read_table(led)
        d = t.to_pydict()
        assert set(d["run_id"]) == {"run1", "run2"}
        totals = {
            (r_, w): n for r_, w, n in
            zip(d["run_id"], d["wave"], d["rows"])
        }
        assert totals[("run1", "total")] == 120
        assert totals[("run2", "total")] == 120
        # warm second run fitted nothing
        fitted = {
            (r_, w): n for r_, w, n in
            zip(d["run_id"], d["wave"], d["rules_fitted"])
        }
        assert fitted[("run2", "total")] == 0
        assert outs[1]["rules_fitted"] == 0


class TestEvaluateRoutes:
    def test_broadcast_and_join_routes_agree(
        self, ray_session, tmp_path, monkeypatch
    ):
        """evaluate_accuracy's two size routes (broadcast expected vs
        distributed url join) must produce identical accuracy numbers;
        the join route is forced by dropping the threshold to 0."""
        import ray

        from adaptive_pdf_extractor_ray.pipelines import extract as ex
        from adaptive_pdf_extractor_ray.sources.synthetic import (
            write_corpus,
        )

        pages_dir, exp_dir = write_corpus(
            str(tmp_path / "c"), n=300, seed=11, shard_rows=100
        )
        res = ex.extract_pages(
            ray.data.read_parquet(pages_dir), str(tmp_path / "w"),
            concurrency=2, write_answers=True,
        )
        expected = ray.data.read_parquet(exp_dir)
        a = ex.evaluate_accuracy(res["answers"], expected)
        monkeypatch.setattr(ex, "EVAL_BROADCAST_MAX", 0)
        b = ex.evaluate_accuracy(res["answers"], expected)
        assert a == b
        assert a["field_accuracy"] == 1.0 and a["doc_accuracy"] == 1.0
