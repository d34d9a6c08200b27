"""Round-4 fixes (VERDICT r3 "Next round" items 1-3 + ADVICE):

1. Checkpointed curation chain: kill-between-stages resume — a run
   stopped after an intermediate stage reruns from its checkpoints
   (completed stages SKIPPED, markers untouched) and the final survivor
   set is byte-identical to the single-lineage `q_curate_neardup`.
   Stale-input markers (corpus changed under the work_dir) recompute.
2. label_prop hub groups: the per-round mode is a pre-summed
   (v, lab) -> n aggregate; with a 100k-degree hub whose neighbors
   carry few distinct labels, no group after the pre-count exceeds the
   distinct-label bound (never the degree).
3. knn_graph: no driver-side pq.read_table of the embedding table —
   the query side is streamed in bounded plasma blocks; result parity
   with a local brute-force replay.
4. markov_perplexity drops single-event users (oracle inner-join
   parity, the ADVICE latent break).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _sorted_ids(ds) -> list[int]:
    return sorted(ds.to_pandas()["doc_id"].tolist())


class TestCurateResume:
    def _mtimes(self, work_dir, stages):
        out = {}
        for s in stages:
            out[s] = os.path.getmtime(os.path.join(work_dir, f"{s}._done"))
        return out

    def test_kill_between_stages_resume(self, ray_session, tmp_path):
        from adaptive_pdf_extractor_ray.pipelines import queries as q
        from adaptive_pdf_extractor_ray.pipelines.curate import (
            curate_neardup_checkpointed,
        )

        wd = str(tmp_path / "ck")
        # "crash" after the pairs stage committed
        stats1: dict = {}
        out = curate_neardup_checkpointed(
            SF, wd, stop_after="pairs", stats_out=stats1
        )
        assert out is None
        assert stats1["ran"] == ["gate", "sigs", "pairs"]
        assert stats1["skipped"] == []
        done = self._mtimes(wd, ["gate", "sigs", "pairs"])
        assert not os.path.exists(os.path.join(wd, "components._done"))

        # rerun to completion: the finished stages are skipped (markers
        # untouched) and only the tail recomputes
        stats2: dict = {}
        out = curate_neardup_checkpointed(SF, wd, stats_out=stats2)
        assert stats2["skipped"] == ["gate", "sigs", "pairs"]
        assert stats2["ran"] == ["components", "survivors"]
        assert self._mtimes(wd, ["gate", "sigs", "pairs"]) == done

        # byte-identical to the single-lineage oracle form
        want = _sorted_ids(q.q_curate_neardup(SF))
        assert _sorted_ids(out) == want

        # a third run skips EVERYTHING and still returns the same set
        stats3: dict = {}
        out = curate_neardup_checkpointed(SF, wd, stats_out=stats3)
        assert stats3["ran"] == []
        assert len(stats3["skipped"]) == 5
        assert _sorted_ids(out) == want

        # lineage audit trail: every stage recorded with a row count
        lin = {r["stage"]: r for r in stats3["lineage"]}
        assert set(lin) == {"gate", "sigs", "pairs", "components",
                            "survivors"}
        assert lin["survivors"]["rows"] == len(want)
        assert all(r["rows"] >= 0 and "ts" in r for r in lin.values())

    def test_stale_input_recomputes(self, ray_session, tmp_path):
        import shutil

        from adaptive_pdf_extractor_ray.pipelines.curate import (
            curate_neardup_checkpointed,
        )

        # copy the corpus so we can touch it without mutating testdata
        src = str(tmp_path / "corpus")
        os.makedirs(src)
        shutil.copy(
            os.path.join(SF, "documents.parquet"),
            os.path.join(src, "documents.parquet"),
        )
        wd = str(tmp_path / "ck")
        curate_neardup_checkpointed(src, wd, stop_after="gate")
        # corpus updated in place -> the gate marker must NOT be trusted
        os.utime(os.path.join(src, "documents.parquet"))
        stats: dict = {}
        curate_neardup_checkpointed(
            src, wd, stop_after="gate", stats_out=stats
        )
        assert stats["ran"] == ["gate"]
        assert stats["skipped"] == []

    def test_training_set_checkpointed_matches(self, ray_session, tmp_path):
        from adaptive_pdf_extractor_ray.pipelines import queries as q
        from adaptive_pdf_extractor_ray.pipelines.curate import (
            build_training_set_checkpointed,
        )

        wd = str(tmp_path / "ts")
        stats1: dict = {}
        assert build_training_set_checkpointed(
            SF, wd, stop_after="chunks", stats_out=stats1
        ) is None
        assert stats1["ran"] == ["uniq", "chunks"]
        stats2: dict = {}
        got = build_training_set_checkpointed(SF, wd, stats_out=stats2)
        assert stats2["skipped"] == ["uniq", "chunks"]
        assert stats2["ran"] == ["packed"]
        g = got.to_pandas().sort_values(
            ["doc_id", "chunk_id"]
        ).reset_index(drop=True)
        w = q.q_build_training_set(SF).to_pandas().sort_values(
            ["doc_id", "chunk_id"]
        ).reset_index(drop=True)
        assert g.equals(w[g.columns.tolist()])


class TestLabelPropHubBound:
    def test_hub_group_bounded_by_distinct_labels(self, ray_session):
        """100k-degree hub, 7 distinct neighbor labels: after the
        per-batch pre-count + (v, lab) groupby-sum, the per-v argmax
        group holds <= 7 rows — never the degree."""
        import ray
        import ray.data as rd

        from adaptive_pdf_extractor_ray.pipelines.queries import (
            _lp_argmax,
            _lp_pre_count,
        )

        hub_deg = 100_000
        n_labels = 7
        nbr = pa.table(
            {
                "v": pa.array(["hub"] * hub_deg, pa.string()),
                "lab": pa.array(
                    [f"c{i % n_labels}" for i in range(hub_deg)],
                    pa.string(),
                ),
            }
        )
        ds = rd.from_arrow(nbr).repartition(8)
        summed = (
            ds.map_batches(_lp_pre_count, batch_format="pyarrow")
            .groupby(["v", "lab"])
            .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
            .materialize()
        )
        # the shuffled relation holds one row per (node, distinct label)
        assert summed.count() == n_labels
        rows = summed.take_all()
        assert sum(r["n"] for r in rows) == hub_deg
        picked = (
            summed.groupby("v")
            .map_groups(_lp_argmax, batch_format="pyarrow")
            .take_all()
        )
        # 100000 = 7*14285 + 5 -> labels c0..c4 have 14286, tie -> c0
        assert picked == [{"node": "hub", "lab": "c0"}]

    def test_pre_count_collapses_within_batch(self):
        from adaptive_pdf_extractor_ray.pipelines.queries import (
            _lp_pre_count,
        )

        t = pa.table(
            {
                "v": pa.array(["hub"] * 50_000, pa.string()),
                "lab": pa.array(
                    ["a" if i % 2 else "b" for i in range(50_000)],
                    pa.string(),
                ),
            }
        )
        out = _lp_pre_count(t)
        assert out.num_rows == 2  # duplicate mass pre-summed in-batch
        assert sorted(out["n"].to_pylist()) == [25_000, 25_000]


class TestKnnGraphStreamedQueries:
    def test_no_driver_read_table_of_embeddings(self):
        """The VERDICT r3 defect was a pq.read_table of the whole
        embedding table on the driver; the source must not do that."""
        import inspect

        from adaptive_pdf_extractor_ray.pipelines import queries as q

        src = inspect.getsource(q.q_knn_graph)
        assert "read_table(" not in src  # the call, not the docstring
        assert "iter_batches" in src  # bounded streaming instead

    def test_matches_bruteforce_replay(self, ray_session):
        from adaptive_pdf_extractor_ray.pipelines import queries as q
        from adaptive_pdf_extractor_ray.pipelines.queries import KNNG_K

        got = (
            q.q_knn_graph(SF)
            .to_pandas()
            .sort_values(["vec_id", "neighbor_id"])
            .reset_index(drop=True)
        )
        t = pq.read_table(
            os.path.join(SF, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        M = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        M = M / np.maximum(
            np.linalg.norm(M, axis=1, keepdims=True), 1e-12
        )
        sims = np.round(M @ M.T, 4)
        want = []
        for qi in range(len(ids)):
            order = sorted(
                (j for j in range(len(ids)) if ids[j] != ids[qi]),
                key=lambda j: (-sims[qi, j], ids[j]),
            )[:KNNG_K]
            want.extend(
                (int(ids[qi]), int(ids[j])) for j in order
            )
        want = sorted(want)
        assert list(map(tuple, got[["vec_id", "neighbor_id"]].values)) == want


class TestMarkovSingleEventUsers:
    def test_single_event_user_dropped(self, ray_session, tmp_path):
        import ray.data as rd

        from adaptive_pdf_extractor_ray.pipelines import queries as q

        ev = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i * 1_000_000
                     for i in range(4)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([10, 10, 10, 99], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "view", "view"], pa.string()
                ),
            }
        )
        d = str(tmp_path / "sf")
        os.makedirs(d)
        pq.write_table(ev, os.path.join(d, "events.parquet"))
        got = q.q_markov_perplexity(d).to_pandas()
        assert set(got["user_id"]) == {10}  # user 99 has no transitions
