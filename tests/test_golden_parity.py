"""Golden parity vs the reference's committed experiment corpora.

The reference's correctness story is its committed result files:
``data/fake/datasets/fake_dataset_*`` paired with
``data/fake/results/*_result.json`` (6 full runs, reference
``docs/experiment.md:25-32``; accuracy 98.26% with cache,
``README.md:31``). These tests run this engine cold over the SAME
committed datasets and assert, field for field against the committed
``expected_answer`` ground truth, accuracy at least matching the
reference's own published number on its own data — the literal
"matches the reference's golden corpus" claim of the north star.

Values are compared after ``normalize_text`` on both sides (the engine's
per-row invariant is byte-identical *normalized* text; the reference's
LLM sees raw text, so its values are un-normalized in the result files).
"""

import json
import os

import pytest

FAKE = "/root/reference/data/fake"
DS1 = f"{FAKE}/datasets/fake_dataset_1000samples_seed_1.json"
RES1 = f"{FAKE}/results/fake_dataset_1000samples_seed_1_with_cache_result.json"
REF_ACCURACY_WITH_CACHE = 0.9826  # reference README.md:31

pytestmark = pytest.mark.skipif(
    not os.path.exists(DS1), reason="reference fake corpus not present"
)


@pytest.fixture(scope="module")
def golden_run(ray_session, tmp_path_factory):
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
    from adaptive_pdf_extractor_ray.sources.readers import read_reference_dataset

    pages, meta = read_reference_dataset(DS1)
    work = tmp_path_factory.mktemp("golden")
    res = extract_pages(rd.from_arrow(pages), str(work), write_answers=False)
    answers = {r["url"]: r for r in res["answers"].take_all()}
    return answers, meta.to_pydict()


def _scores(answers, meta):
    from adaptive_pdf_extractor_ray.functions.textnorm import normalize_text

    tot = match = 0
    misses = []
    for i, url in enumerate(meta["url"]):
        exp = json.loads(meta["expected_json"][i])
        got = json.loads(answers[url]["extracted_json"] or "{}")
        for k, v in exp.items():
            want = None if v is None else normalize_text(v)
            tot += 1
            if got.get(k, "<ABSENT>") == want:
                match += 1
            elif len(misses) < 10:
                misses.append((url, k, want, got.get(k, "<ABSENT>")))
    return match, tot, misses


class TestGoldenSeed1:
    def test_field_accuracy_beats_reference(self, golden_run):
        answers, meta = golden_run
        match, tot, misses = _scores(answers, meta)
        assert tot == 8000
        acc = match / tot
        assert acc >= REF_ACCURACY_WITH_CACHE, (acc, misses)

    def test_field_accuracy_is_exact(self, golden_run):
        """Stronger than the reference: zero field errors on its corpus
        (the glue-anchor fallback recovers the 'Subsecaoda Cruz' records
        the strict boundary scan misses)."""
        answers, meta = golden_run
        match, tot, misses = _scores(answers, meta)
        assert match == tot, misses

    def test_agreement_with_committed_extractions(self, golden_run):
        """Per-field agreement with the reference's own committed
        `extracted` values ≥ its own published accuracy — disagreements
        are bounded by the reference's error rate, not ours."""
        from adaptive_pdf_extractor_ray.functions.textnorm import normalize_text

        answers, meta = golden_run
        ref = json.load(open(RES1))
        agree = tot = 0
        for i, url in enumerate(meta["url"]):
            got = json.loads(answers[url]["extracted_json"] or "{}")
            for k, rv in ref[i]["extracted"].items():
                want = None if rv is None else normalize_text(str(rv))
                tot += 1
                agree += got.get(k, "<ABSENT>") == want
        assert agree / tot >= REF_ACCURACY_WITH_CACHE - 0.005

    def test_all_records_processed_without_error(self, golden_run):
        answers, _ = golden_run
        assert len(answers) == 1000
        assert all(r["error"] is None for r in answers.values())


@pytest.mark.parametrize(
    "stem",
    [
        "fake_dataset_1000samples_seed_2",
        "fake_dataset_1000samples_seed_3",
        "fake_dataset_2000samples_seed_1",
        "fake_dataset_3000samples_seed_1",
    ],
)
def test_other_committed_corpora(ray_session, tmp_path_factory, stem):
    """Every committed experiment corpus (docs/experiment.md grid) clears
    the reference's published accuracy through this engine."""
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
    from adaptive_pdf_extractor_ray.sources.readers import read_reference_dataset

    pages, meta = read_reference_dataset(f"{FAKE}/datasets/{stem}.json")
    work = tmp_path_factory.mktemp(f"golden_{stem}")
    res = extract_pages(rd.from_arrow(pages), str(work), write_answers=False)
    answers = {r["url"]: r for r in res["answers"].take_all()}
    match, tot, misses = _scores(answers, meta.to_pydict())
    assert match / tot >= REF_ACCURACY_WITH_CACHE, (match / tot, misses)


def test_warm_store_transfers_across_seeds(ray_session, tmp_path_factory):
    """The reference's experiment grid reuses a warmed cache across
    datasets (docs/experiment.md: 'with cache' runs). Mirror it: fit on
    seed 1, then run seed 2 with the SAME store — accuracy must still
    clear the reference's number and the warm run must fit few or no new
    rules (the templates transfer)."""
    import ray.data as rd

    from adaptive_pdf_extractor_ray.pipelines.extract import extract_pages
    from adaptive_pdf_extractor_ray.sources.readers import read_reference_dataset

    pages1, _ = read_reference_dataset(DS1)
    w1 = tmp_path_factory.mktemp("xseed1")
    r1 = extract_pages(rd.from_arrow(pages1), str(w1), write_answers=False)

    pages2, meta2 = read_reference_dataset(
        f"{FAKE}/datasets/fake_dataset_1000samples_seed_2.json"
    )
    w2 = tmp_path_factory.mktemp("xseed2")
    r2 = extract_pages(
        rd.from_arrow(pages2), str(w2), store_path=r1["store_path"],
        write_answers=False,
    )
    answers = {r["url"]: r for r in r2["answers"].take_all()}
    match, tot, misses = _scores(answers, meta2.to_pydict())
    assert match / tot >= REF_ACCURACY_WITH_CACHE, (match / tot, misses)
    # warm transfer: the second corpus needs (almost) no new rules
    assert r2["rules_fitted"] <= r1["rules_total"] * 0.25, (
        r2["rules_fitted"], r1["rules_total"])
