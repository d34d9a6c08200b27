"""End-to-end Ray Data pipeline tests: correctness, warm start, resume."""

import json
import os
import shutil

import duckdb
import pytest

from adaptive_pdf_extractor_ray.pipelines.extract import (
    evaluate_accuracy,
    extract_pages,
)
from adaptive_pdf_extractor_ray.sources.synthetic import write_corpus
from adaptive_pdf_extractor_ray.state.rulestore import RuleStore

N = 400
SEED = 7


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("corpus")
    pages_dir, exp_dir = write_corpus(str(root), n=N, seed=SEED, shard_rows=100)
    return pages_dir, exp_dir


@pytest.fixture(scope="module")
def cold_run(corpus, tmp_path_factory, ray_session):
    import ray.data as rd

    pages_dir, exp_dir = corpus
    work = str(tmp_path_factory.mktemp("work"))
    res = extract_pages(rd.read_parquet(pages_dir), work)
    return res, pages_dir, exp_dir, work


class TestColdStart:
    def test_all_rows_out(self, cold_run):
        res, *_ = cold_run
        assert res["answers"].count() == N

    def test_rules_fitted(self, cold_run):
        res, *_ = cold_run
        assert res["rules_fitted"] > 0
        store = RuleStore.load(res["store_path"])
        assert len(store) == res["rules_total"]
        # two template families
        assert len(store.fingerprints()) == 2

    def test_field_accuracy_100(self, cold_run):
        import ray.data as rd

        res, _, exp_dir, _ = cold_run
        acc = evaluate_accuracy(res["answers"], rd.read_parquet(exp_dir))
        assert acc["field_accuracy"] == 1.0
        assert acc["doc_accuracy"] == 1.0

    def test_text_byte_identical_per_url(self, cold_run):
        res, _, exp_dir, work = cold_run
        globs = ", ".join(f"'{d}/*.parquet'" for d in res["answer_dirs"])
        con = duckdb.connect()
        total, same = con.execute(
            f"""
            select count(*),
                   sum(case when a.text_norm = e.expected_text then 1 else 0 end)
            from read_parquet([{globs}]) a
            join read_parquet('{exp_dir}/*.parquet') e using (url)
            """
        ).fetchone()
        assert total == N and same == N

    def test_no_errors(self, cold_run):
        import pyarrow.compute as pc

        res, *_ = cold_run
        errs = res["answers"].map_batches(
            lambda t: t.filter(pc.is_valid(t["error"])), batch_format="pyarrow"
        ).count()
        assert errs == 0

    def test_weights_accumulated(self, cold_run):
        res, *_ = cold_run
        store = RuleStore.load(res["store_path"])
        tbl = store.to_table().to_pydict()
        # value rules applied hundreds of times must outweigh initial 1
        assert max(tbl["weight"]) > 50


class TestWarmStart:
    def test_no_misses_second_run(self, cold_run, corpus, tmp_path_factory):
        import ray.data as rd

        res, pages_dir, exp_dir, _ = cold_run
        work2 = str(tmp_path_factory.mktemp("work2"))
        res2 = extract_pages(
            rd.read_parquet(pages_dir), work2, store_path=res["store_path"]
        )
        # warm store: nothing new to fit
        assert res2["rules_fitted"] == 0
        acc = evaluate_accuracy(res2["answers"], rd.read_parquet(exp_dir))
        assert acc["field_accuracy"] == 1.0

    def test_unseen_seed_generalizes(self, cold_run, tmp_path_factory):
        """Rules fitted on seed=7 must extract a seed=11 corpus perfectly
        (the reference's cross-seed generalization experiments,
        docs/experiment.md:25-32)."""
        import ray.data as rd

        res, *_ = cold_run
        root = tmp_path_factory.mktemp("corpus11")
        pages_dir, exp_dir = write_corpus(str(root), n=200, seed=11, shard_rows=100)
        work = str(tmp_path_factory.mktemp("work11"))
        res2 = extract_pages(
            rd.read_parquet(pages_dir), work, store_path=res["store_path"]
        )
        acc = evaluate_accuracy(res2["answers"], rd.read_parquet(exp_dir))
        assert acc["field_accuracy"] == 1.0


class TestResume:
    def test_wave1_checkpoint_skipped_on_rerun(self, corpus, tmp_path_factory):
        import ray.data as rd

        pages_dir, _ = corpus
        work = str(tmp_path_factory.mktemp("work_resume"))
        res1 = extract_pages(rd.read_parquet(pages_dir), work, write_answers=False)
        assert os.path.exists(os.path.join(work, "wave1._done"))
        # poison the source: if wave 1 re-ran it would fail on missing files
        res2 = extract_pages(
            rd.read_parquet(pages_dir).limit(0), work, write_answers=False
        )
        assert res2["answers"].count() == N  # served from the checkpoint


class TestErrorIsolation:
    def test_bad_pdf_goes_to_error_column(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from adaptive_pdf_extractor_ray.sources.synthetic import PAGES_SCHEMA

        rows = pa.table(
            {
                "url": ["u1", "u2"],
                "warc_ts": pa.array([None, None], pa.timestamp("us")),
                "html": pa.array([b"%PDF-1.4 garbage no page", None], pa.binary()),
                "text": [None, "Nome Ana Inscricao 123456"],
                "lang": ["pt", "pt"],
            },
            schema=PAGES_SCHEMA,
        )
        res = extract_pages(
            rd.from_arrow(rows), str(tmp_path / "w"), write_answers=False
        )
        out = {r["url"]: r for r in res["answers"].take_all()}
        assert out["u1"]["error"] is not None
        assert out["u2"]["error"] is None
        assert json.loads(out["u2"]["extracted_json"])["nome"] == "Ana"


class TestSpans:
    def test_span_offsets_slice_to_values(self, cold_run):
        """North-star invariant: per url, every extracted value's span
        offsets slice text_norm byte-identically to the value (nulls have
        empty spans)."""
        res, *_ = cold_run
        rows = res["answers"].take_all()
        checked = 0
        for r in rows:
            if not r["spans_json"]:
                continue
            ans = json.loads(r["extracted_json"])
            spans = json.loads(r["spans_json"])
            text = r["text_norm"]
            for f, (s, e) in spans.items():
                v = ans.get(f)
                if v is None:
                    assert s == e, (r["url"], f)
                else:
                    assert text[s:e] == v, (r["url"], f, text[s:e], v)
                checked += 1
        assert checked > N  # at least one field per row on average


class TestBinaryPayload:
    def test_opaque_binary_classified_not_html(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from adaptive_pdf_extractor_ray.sources.synthetic import PAGES_SCHEMA

        rows = pa.table(
            {
                "url": ["bin1"],
                "warc_ts": pa.array([None], pa.timestamp("us")),
                "html": pa.array([bytes(range(256)) * 4], pa.binary()),
                "text": pa.array([None], pa.string()),
                "lang": ["xx"],
            },
            schema=PAGES_SCHEMA,
        )
        res = extract_pages(
            rd.from_arrow(rows), str(tmp_path / "w"), write_answers=False
        )
        r = res["answers"].take_all()[0]
        assert r["kind"] == "binary"
        assert r["error"] is None and r["text_norm"] is None


class TestAdaptiveReordering:
    def test_weights_flip_rule_try_order_across_runs(
        self, ray_session, tmp_path
    ):
        """The reference's adaptive priority (bubble-up) at checkpoint
        granularity: a specific rule fitted from early exemplars loses
        priority to the generic rule once the corpus stops matching it."""
        import pyarrow as pa
        import ray.data as rd

        from adaptive_pdf_extractor_ray.sources.synthetic import PAGES_SCHEMA

        def pages(texts, tag):
            return pa.table(
                {
                    "url": [f"{tag}{i}" for i in range(len(texts))],
                    "warc_ts": pa.array([None] * len(texts), pa.timestamp("us")),
                    "html": pa.array([None] * len(texts), pa.binary()),
                    "text": texts,
                    "lang": ["pt"] * len(texts),
                },
                schema=PAGES_SCHEMA,
            )

        # run 1: 6-digit inscricao values -> a tight specific rule fits
        run1 = [f"Nome Ana{i} Lima Inscricao 10000{i}" for i in range(10)]
        res1 = extract_pages(
            rd.from_arrow(pages(run1, "a")), str(tmp_path / "w1"),
            store_path=str(tmp_path / "rules.parquet"),
        )
        store1 = RuleStore.load(res1["store_path"])
        insc1 = store1.compiled()
        fp = next(iter(insc1))
        first_rule_run1 = insc1[fp]["inscricao"].rules[0]
        assert "[0-9]{6,6}" in first_rule_run1.pattern  # specific leads

        # run 2: 9-digit values -> specific misses, generic collects hits
        run2 = [f"Nome Rui{i} Dias Inscricao 90000000{i}" for i in range(50)]
        res2 = extract_pages(
            rd.from_arrow(pages(run2, "b")), str(tmp_path / "w2"),
            store_path=res1["store_path"],
        )
        store2 = RuleStore.load(res2["store_path"])
        first_rule_run2 = store2.compiled()[fp]["inscricao"].rules[0]
        # generic (span) rule outweighs the stale specific rule now
        assert first_rule_run2.kind == "span", first_rule_run2.pattern
        # and the 9-digit values were still extracted correctly (fallthrough)
        out = {r["url"]: r for r in res2["answers"].take_all()}
        assert json.loads(out["b0"]["extracted_json"])["inscricao"] == "900000000"


class TestShardedStoreApply:
    def test_sharded_apply_matches_broadcast(self, corpus, tmp_path_factory):
        """apply_shards path (groupby-bucket, per-bucket store slices) must
        produce the same answers as the broadcast actor-pool path."""
        import ray.data as rd

        pages_dir, exp_dir = corpus
        # broadcast run
        w1 = str(tmp_path_factory.mktemp("bc"))
        r1 = extract_pages(rd.read_parquet(pages_dir), w1, write_answers=False)
        # sharded run, warm from the broadcast store (deterministic rules)
        w2 = str(tmp_path_factory.mktemp("sh"))
        r2 = extract_pages(
            rd.read_parquet(pages_dir), w2, store_path=r1["store_path"],
            write_answers=False, apply_shards=4,
        )
        a = {r["url"]: r for r in r1["answers"].take_all()}
        b = {r["url"]: r for r in r2["answers"].take_all()}
        assert set(a) == set(b)
        for u in a:
            assert a[u]["extracted_json"] == b[u]["extracted_json"], u
            assert a[u]["text_norm"] == b[u]["text_norm"], u
        acc = evaluate_accuracy(r2["answers"], __import__("ray").data.read_parquet(exp_dir))
        assert acc["field_accuracy"] == 1.0


class TestIdempotentWeights:
    def test_rerun_of_completed_workdir_keeps_weights(
        self, cold_run, corpus, tmp_path_factory
    ):
        """Re-running extract_pages on a finished work_dir must not fold
        the same hits into rule weights again (resume idempotency)."""
        import ray.data as rd

        res, pages_dir, _, work = cold_run
        before = {
            r["rule_id"]: r["weight"]
            for r in RuleStore.load(res["store_path"]).to_table().to_pylist()
        }
        extract_pages(rd.read_parquet(pages_dir), work)
        after = {
            r["rule_id"]: r["weight"]
            for r in RuleStore.load(res["store_path"]).to_table().to_pylist()
        }
        assert before == after


class TestRuleFaultIsolation:
    def test_nonparticipating_group_is_miss_not_crash(self):
        from adaptive_pdf_extractor_ray.functions.rules import Rule

        r = Rule(pattern=r"Foo|(Bar)", validation_regex=r"^.*$")
        assert r.apply("Foo something") is None  # group 1 didn't participate
        assert r.apply("Bar") == "Bar"


class TestCorpusRegeneration:
    def test_param_change_clears_stale_shards(self, tmp_path, ray_session):
        import glob

        root = str(tmp_path / "c")
        write_corpus(root, n=400, seed=1, shard_rows=100)  # 4 shards
        assert len(glob.glob(f"{root}/pages/part-*.parquet")) == 4
        write_corpus(root, n=100, seed=1, shard_rows=100)  # 1 shard
        assert len(glob.glob(f"{root}/pages/part-*.parquet")) == 1
        assert len(glob.glob(f"{root}/expected/part-*.parquet")) == 1


class TestIncrementalWatch:
    def test_watch_ingests_in_arrival_order_and_resumes(
        self, tmp_path, ray_session
    ):
        """CLI watch: two arrival waves of input shards extract
        incrementally into one shared store; the second invocation picks
        up only the new files (ledger resume)."""
        import glob
        import shutil

        from adaptive_pdf_extractor_ray.__main__ import main

        src = tmp_path / "incoming"
        src.mkdir()
        corpus = tmp_path / "gen"
        pages_dir, _ = write_corpus(str(corpus), n=300, seed=7, shard_rows=100)
        parts = sorted(glob.glob(f"{pages_dir}/part-*.parquet"))
        assert len(parts) == 3
        shutil.copy(parts[0], src / "a.parquet")
        work = tmp_path / "watchwork"

        rc = main(["watch", "--input", str(src), "--work-dir", str(work),
                   "--once"])
        assert rc == 0

        shutil.copy(parts[1], src / "b.parquet")
        shutil.copy(parts[2], src / "c.parquet")
        (src / "_COMPLETE").write_text("")
        rc = main(["watch", "--input", str(src), "--work-dir", str(work),
                   "--poll-s", "0.1"])
        assert rc == 0

        import json as _json

        ledger = _json.loads((work / "ingested.json").read_text())
        assert len(ledger) == 3
        # all 300 rows extracted across the incremental batches
        import ray.data as rd

        answer_files = []
        for d in sorted(glob.glob(f"{work}/ingest-*")):
            for sub in ("wave1/refit=0", "wave2"):
                answer_files.extend(sorted(glob.glob(f"{d}/{sub}/*.parquet")))
        total = rd.read_parquet(answer_files).count()
        assert total == 300

    def test_watch_workdir_keyed_by_file_set_not_ledger_length(
        self, tmp_path, ray_session
    ):
        """A crashed batch's stale wave1._done must never skip files that
        were not in the original batch: the sub-work-dir is keyed by the
        md5 of the batch's file list, so a restart whose pending set has
        changed gets a fresh work dir (and each batch records its file
        manifest)."""
        import glob
        import hashlib
        import shutil

        from adaptive_pdf_extractor_ray.__main__ import main

        src = tmp_path / "incoming"
        src.mkdir()
        corpus = tmp_path / "gen"
        pages_dir, _ = write_corpus(str(corpus), n=200, seed=3, shard_rows=100)
        parts = sorted(glob.glob(f"{pages_dir}/part-*.parquet"))
        shutil.copy(parts[0], src / "b.parquet")
        work = tmp_path / "watchwork"
        work.mkdir()

        # simulate the pre-crash state: a batch over ONLY [b] completed
        # wave 1 (its _done marker exists) but died before finishing —
        # then c arrived before restart
        key_b = hashlib.md5(str(src / "b.parquet").encode()).hexdigest()[:16]
        stale = work / f"ingest-{key_b}"
        stale.mkdir()
        (stale / "wave1._done").write_text("{}")
        shutil.copy(parts[1], src / "c.parquet")

        rc = main(["watch", "--input", str(src), "--work-dir", str(work),
                   "--once"])
        assert rc == 0
        # the restarted batch [b, c] got its OWN work dir and extracted
        # both files — nothing was silently dropped by the stale marker
        import ray.data as rd

        answer_files = []
        for d in sorted(glob.glob(f"{work}/ingest-*")):
            if str(d) == str(stale):
                continue
            for sub in ("wave1/refit=0", "wave2"):
                answer_files.extend(sorted(glob.glob(f"{d}/{sub}/*.parquet")))
        assert rd.read_parquet(answer_files).count() == 200
        # the batch recorded its file manifest
        manifests = glob.glob(f"{work}/ingest-*/files.json")
        assert any(
            sorted(json.load(open(m))) == [str(src / "b.parquet"),
                                           str(src / "c.parquet")]
            for m in manifests
        )

    def test_watch_defers_unstable_files_and_survives_bad_shards(
        self, tmp_path, ray_session, capsys
    ):
        """Without --once a file is only taken after its size is stable
        across two polls, and a corrupt shard fails its batch without
        killing the watcher or entering the ledger."""
        import glob
        import shutil

        from adaptive_pdf_extractor_ray.__main__ import main

        src = tmp_path / "incoming"
        src.mkdir()
        corpus = tmp_path / "gen"
        pages_dir, _ = write_corpus(str(corpus), n=100, seed=5, shard_rows=100)
        part = sorted(glob.glob(f"{pages_dir}/part-*.parquet"))[0]
        shutil.copy(part, src / "good.parquet")
        (src / "bad.parquet").write_bytes(b"not a parquet file")
        work = tmp_path / "watchwork"

        rc = main(["watch", "--input", str(src), "--work-dir", str(work),
                   "--poll-s", "0.05", "--max-polls", "2"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["failures"] >= 1
        ledger = json.loads((work / "ingested.json").read_text())
        # the good shard was ingested (after the one-poll stability
        # deferral); the corrupt one was retried but never ledgered
        assert str(src / "good.parquet") in ledger
        assert str(src / "bad.parquet") not in ledger


@pytest.mark.parametrize("seed,tela_ratio,filler", [(11, 0.5, 0), (17, 0.0, 40), (23, 1.0, 10)])
def test_accuracy_100_across_protocol_variants(
    ray_session, tmp_path_factory, seed, tela_ratio, filler
):
    """100% field accuracy holds across generator-protocol variants:
    different seeds, template mixes (all-carteira / all-tela / 50-50)
    and filler weights — not just the default fixture."""
    import ray.data as rd

    root = tmp_path_factory.mktemp(f"var_{seed}")
    pages_dir, exp_dir = write_corpus(
        str(root), n=400, seed=seed, shard_rows=200,
        tela_ratio=tela_ratio, filler_words=filler,
    )
    work = str(tmp_path_factory.mktemp(f"var_work_{seed}"))
    res = extract_pages(rd.read_parquet(pages_dir), work, write_answers=False)
    acc = evaluate_accuracy(res["answers"], rd.read_parquet(exp_dir))
    assert acc["field_accuracy"] == 1.0
    assert acc["doc_accuracy"] == 1.0


class TestConcurrentShards:
    def test_two_shard_processes_share_one_store(self, tmp_path_factory):
        """Two CLI shard processes running CONCURRENTLY against one
        rules.parquet: the flock + delta-merge save must preserve both
        shards' fitted rules and all answers (the ADVICE r1 scenario —
        previously last-writer-wins)."""
        import glob
        import json as _json
        import subprocess
        import sys

        root = tmp_path_factory.mktemp("conc")
        corpus = root / "gen"
        pages_dir, exp_dir = write_corpus(str(corpus), n=400, seed=5,
                                          shard_rows=100)
        work = root / "run"
        store = str(work / "rules.parquet")
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "adaptive_pdf_extractor_ray",
                 "extract", "--input", pages_dir, "--work-dir", str(work),
                 "--store", store, "--shard", str(i), "--num-shards", "2",
                 "--num-cpus", "4", "--concurrency", "2"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                cwd="/root/repo",
                env={k: v for k, v in os.environ.items()
                     if k != "RAY_ADDRESS"},
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=420) for p in procs]
        assert all(p.returncode == 0 for p in procs), [
            o[1].decode()[-500:] for o in outs
        ]
        outs = [o[0] for o in outs]
        rows = sum(
            _json.loads(o.decode().strip().splitlines()[-1])["rows"]
            for o in outs
        )
        assert rows == 400
        final = RuleStore.load(store)
        assert len(final.fingerprints()) == 2  # both templates survived
        # all answers across both shard work-dirs score 100%
        import ray.data as rd

        files = []
        for d in sorted(glob.glob(f"{work}/shard=*")):
            for sub in ("wave1/refit=0", "wave2"):
                files.extend(sorted(glob.glob(f"{d}/{sub}/*.parquet")))
        acc = evaluate_accuracy(rd.read_parquet(files), rd.read_parquet(exp_dir))
        assert acc["field_accuracy"] == 1.0


class TestCurateCli:
    def test_curate_writes_survivors_with_text(self, ray_session, tmp_path, capsys):
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from adaptive_pdf_extractor_ray.__main__ import main

        # 6 good en docs (2 byte-identical), 1 short, 1 non-en-looking
        base = ("the quick brown fox jumps over the lazy dog and then "
                "it runs far away to the old barn in the field again ") * 3
        texts = [base, base, base + "tail one", base + "tail two",
                 base + "tail three", base + "tail four",
                 "too short", "zzz qqq xxx vvv kkk www " * 10]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        out = tmp_path / "curated"
        rc = main(["curate", "--input", str(tmp_path), "--out", str(out)])
        assert rc == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows_in"] == len(texts)
        got = pq.read_table(str(out)).to_pylist()
        assert rep["rows_kept"] == len(got)
        kept_ids = {r["doc_id"] for r in got}
        assert 0 in kept_ids and 1 not in kept_ids  # exact dup dropped
        assert all("text" in r and r["text"] for r in got)  # text re-attached

    def test_curate_lm_gate_drops_atypical_docs(self, ray_session, tmp_path,
                                                capsys):
        """--lm-max-bits drops the doc whose tokens are rare under the
        corpus unigram model while keeping typical survivors."""
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from adaptive_pdf_extractor_ray.__main__ import main

        base = ("the quick brown fox jumps over the lazy dog and then "
                "it runs far away to the old barn in the field again ") * 3
        # doc 3: passes the quality/lang gate (it contains base's English
        # text) but carries 60 corpus-unique tokens -> highest code length
        rare = base + " " + " ".join(f"tok{i}xq" for i in range(60))
        texts = [base + "a", base + "b", base + "c", rare]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, str(tmp_path / "documents.parquet"))

        # wide-open budget keeps everything the base chain keeps
        out_all = tmp_path / "cur_all"
        assert main(["curate", "--input", str(tmp_path),
                     "--out", str(out_all), "--lm-max-bits", "99"]) == 0
        rep_all = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep_all["chain"] == "curate_documents+lm"
        kept_all = {r["doc_id"] for r in pq.read_table(str(out_all)).to_pylist()}

        # the all-rare doc is the most expensive under the model: a
        # budget below its score (but above the typical docs') drops it
        out_lm = tmp_path / "cur_lm"
        assert main(["curate", "--input", str(tmp_path),
                     "--out", str(out_lm), "--lm-max-bits", "5.5"]) == 0
        _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        kept_lm = {r["doc_id"] for r in pq.read_table(str(out_lm)).to_pylist()}
        assert 3 in kept_all and 3 not in kept_lm
        assert kept_lm == kept_all - {3}


class TestOversizeRoute:
    def test_oversize_routing_matches_unrouted(self, corpus, tmp_path_factory):
        """oversize_bytes routes giant payloads through a batch_size=1
        branch of the same pool; output must be row-identical to the
        unrouted plan (the north-star 'skew-aware repartitioning of
        oversized PDFs' guard)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        pages_dir, _ = corpus
        # graft two oversized rows (padded text beyond the threshold)
        # onto the corpus as an extra shard
        base = pq.read_table(pages_dir + "/part-00000.parquet")
        row = base.slice(0, 1).to_pylist()[0]
        big_rows = []
        for j in range(2):
            r = dict(row)
            r["url"] = f"https://big.example/giant{j}"
            r["text"] = (r["text"] or "pad") + " " + ("x" * 40_000)
            r["html"] = None
            big_rows.append(r)
        extra = pa.Table.from_pylist(big_rows, schema=base.schema)
        pq.write_table(extra, pages_dir + "/part-zzbig.parquet")
        try:
            w1 = str(tmp_path_factory.mktemp("plain"))
            r1 = extract_pages(
                rd.read_parquet(pages_dir), w1, write_answers=False
            )
            w2 = str(tmp_path_factory.mktemp("routed"))
            r2 = extract_pages(
                rd.read_parquet(pages_dir), w2, store_path=r1["store_path"],
                write_answers=False, oversize_bytes=8_192,
            )
            a = {r["url"]: r for r in r1["answers"].take_all()}
            b = {r["url"]: r for r in r2["answers"].take_all()}
            assert set(a) == set(b)
            assert "https://big.example/giant0" in a
            for u in a:
                assert a[u]["extracted_json"] == b[u]["extracted_json"], u
                assert a[u]["text_norm"] == b[u]["text_norm"], u
        finally:
            os.remove(pages_dir + "/part-zzbig.parquet")


class TestPartialHitWarm:
    def test_partial_hit_warm_answers_readable(self, corpus, tmp_path_factory):
        """Warm run where SOME rows hit (land in wave1/refit=0) and some
        miss (land in wave2): the final answers read spans two dirs —
        regression for read_parquet failing on a multi-element list of
        directory paths."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        pages_dir, _ = corpus
        base = pq.read_table(pages_dir + "/part-00000.parquet")
        row = base.slice(0, 1).to_pylist()[0]
        novel = []
        for j in range(3):
            r = dict(row)
            r["url"] = f"https://novel.example/n{j}"
            r["text"] = f"Campo Novo: valor{j}\nOutra Linha: x{j}"
            r["html"] = None
            novel.append(r)
        extra = pa.Table.from_pylist(novel, schema=base.schema)
        pq.write_table(extra, pages_dir + "/part-zznovel.parquet")
        try:
            w1 = str(tmp_path_factory.mktemp("cold2"))
            r1 = extract_pages(rd.read_parquet(pages_dir + "/part-00000.parquet"), w1,
                               write_answers=False)
            w2 = str(tmp_path_factory.mktemp("warm2"))
            r2 = extract_pages(
                rd.read_parquet(pages_dir), w2, store_path=r1["store_path"],
                write_answers=True,
            )
            assert len(r2["answer_dirs"]) == 2  # refit=0 AND wave2
            urls = {r["url"] for r in r2["answers"].select_columns(["url"]).take_all()}
            assert "https://novel.example/n0" in urls
            assert len(urls) == base.num_rows + len({r["url"] for r in novel}) + (
                rd.read_parquet(pages_dir).count() - base.num_rows - 3
            )
        finally:
            os.remove(pages_dir + "/part-zznovel.parquet")
