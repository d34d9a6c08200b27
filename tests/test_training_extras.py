"""Unit tests for the session-5 training-set assembly operators:
deterministic hash splits, BM25 retrieval, embedding outlier scoring and
DSIR importance weights. The oracle gate pins end-to-end values on the
fixture tables; these pin the behavioral semantics on hand-built
corpora (ordering, determinism, sign conventions, edge rows)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _write_documents(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(
                [r[2] if len(r) > 2 else "en" for r in rows], pa.string()
            ),
            "source": pa.array(["s0"] * len(rows), pa.string()),
            "n_chars": pa.array(
                [len(r[1]) for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


class TestSplitAssign:
    def test_deterministic_and_consistent(self, ray_session):
        a = q.QUERIES["split_assign"](SF).to_pandas().sort_values("doc_id")
        b = q.QUERIES["split_assign"](SF).to_pandas().sort_values("doc_id")
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
        # split is a pure function of bucket
        for _, r in a.iterrows():
            want = (
                "train" if r["bucket"] < q.SPLIT_TRAIN
                else "valid" if r["bucket"] < q.SPLIT_VALID else "test"
            )
            assert r["split"] == want

    def test_fractions_near_80_10_10(self, ray_session):
        df = q.QUERIES["split_assign"](SF).to_pandas()
        frac = df["split"].value_counts(normalize=True)
        assert 0.7 < frac["train"] < 0.9
        assert 0.04 < frac["valid"] < 0.17
        assert 0.04 < frac["test"] < 0.17


class TestBm25:
    def test_tf_and_brevity_ordering(self, ray_session, tmp_path):
        # doc 1: dense in query terms and short -> must outrank doc 2
        # (same tf, longer) and doc 3 (fewer terms); doc 4 has none.
        sf = _write_documents(
            tmp_path,
            [
                (1, "hash join stream hash"),
                (2, "hash join stream hash " + "filler " * 40),
                (3, "hash only here"),
                (4, "nothing relevant at all"),
            ],
        )
        df = q.QUERIES["bm25_search"](sf).to_pandas()
        assert list(df["doc_id"]) == sorted(
            df["doc_id"], key=lambda d: -df.set_index("doc_id")["score"][d]
        )
        ranked = list(df["doc_id"])
        assert 4 not in ranked  # zero-score docs never returned
        assert ranked.index(1) < ranked.index(2) < ranked.index(3)

    def test_scores_rounded_and_positive(self, ray_session):
        df = q.QUERIES["bm25_search"](SF).to_pandas()
        assert len(df) <= q.BM25_TOPK
        assert (df["score"] > 0).all()
        assert np.allclose(df["score"], np.round(df["score"], 6))


class TestEmbeddingOutliers:
    def test_planted_outlier_flagged(self, ray_session, tmp_path):
        rng = np.random.default_rng(7)
        X = rng.normal(0, 0.05, size=(64, 8)).astype(np.float32)
        X[63] = 5.0  # far from the centroid
        t = pa.table(
            {
                "vec_id": pa.array(range(64), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in X], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 64, pa.int32()),
            }
        )
        pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
        df = (
            q.QUERIES["embedding_outliers"](str(tmp_path))
            .to_pandas()
            .set_index("vec_id")
        )
        assert bool(df.loc[63, "is_outlier"])
        assert not df.drop(index=63)["is_outlier"].any()
        assert df.loc[63, "z"] > q.OUTLIER_Z

    def test_all_rows_scored(self, ray_session):
        df = q.QUERIES["embedding_outliers"](SF).to_pandas()
        assert len(df) == 500
        assert df["dist"].min() >= 0


class TestDsirWeights:
    def test_target_like_docs_score_higher(self, ray_session, tmp_path):
        # 'goodword' appears only in target-lang docs, 'badword' only in
        # the others; a goodword doc must carry a higher log-ratio than
        # a badword doc of the same length.
        rows = []
        for i in range(20):
            rows.append((i, "goodword " * 10, "en"))
        for i in range(20, 40):
            rows.append((i, "badword " * 10, "de"))
        sf = _write_documents(tmp_path, [(d, t.strip(), l) for d, t, l in rows])
        df = (
            q.QUERIES["dsir_weights"](sf).to_pandas().set_index("doc_id")
        )
        assert df.loc[0, "dsir_logratio"] > df.loc[20, "dsir_logratio"]
        # target-only tokens have p_tgt > p_raw is false (they are in raw
        # too) but their ratio must beat tokens absent from the target
        assert df.loc[0, "dsir_logratio"] > 0 > df.loc[20, "dsir_logratio"]

    def test_empty_doc_dropped(self, ray_session, tmp_path):
        sf = _write_documents(
            tmp_path, [(1, "hello world", "en"), (2, "", "en")]
        )
        df = q.QUERIES["dsir_weights"](sf).to_pandas()
        assert set(df["doc_id"]) == {1}
        assert df["n_tokens"].iloc[0] == 2


class TestCrawlFrontier:
    def test_politeness_schedule_shape(self, ray_session):
        df = q.QUERIES["crawl_frontier"]("/root/testdata/sf0.001").to_pandas()
        assert len(df) > 0
        # frontier is exactly the unfetched quarter (page number % 4 == 3)
        assert (df["url"].str.extract(r"p(\d+)$")[0].astype(int) % 4 == 3).all()
        for _, g in df.groupby("host"):
            g = g.sort_values("url").reset_index(drop=True)
            # slots are 0..n-1 in url order, offsets respect the delay
            assert list(g["slot"]) == list(range(len(g)))
            assert (g["offset_s"] == g["slot"] * q.CRAWL_DELAY_S).all()

    def test_refs_positive(self, ray_session):
        df = q.QUERIES["crawl_frontier"]("/root/testdata/sf0.001").to_pandas()
        assert (df["n_refs"] >= 1).all()


class TestTopTermsByLang:
    def test_k_per_lang_and_rank_order(self, ray_session):
        df = q.QUERIES["top_terms_by_lang"](SF).to_pandas()
        for _, g in df.groupby("lang"):
            assert len(g) <= q.LANG_TOPK
            g = g.sort_values("rank").reset_index(drop=True)
            assert list(g["rank"]) == list(range(1, len(g) + 1))
            # counts weakly decreasing down the ranking; ties by word asc
            assert (g["n"].diff().dropna() <= 0).all()

    def test_tiny_corpus_tie_break(self, ray_session, tmp_path):
        sf = _write_documents(
            tmp_path,
            [(1, "b a a", "en"), (2, "b c", "fr")],
        )
        df = (
            q.QUERIES["top_terms_by_lang"](sf)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        en = df[df["lang"] == "en"]
        assert list(en["word"]) == ["a", "b"]  # a:2 then b:1
        fr = df[df["lang"] == "fr"]
        assert list(fr["word"]) == ["b", "c"]  # tie n=1 -> word asc
