"""Unit tests for the session-16 operators: per-user event-type Markov
transitions, global embedding standardization / covariance (the
distributed-PCA reduction), broadcast-query copy search, and the
quality-signal correlation audit. Oracle value-parity is covered by the
driver gate / check_oracles; these pin the numeric semantics against
independent numpy/pandas ground truth.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import adaptive_pdf_extractor_ray.stages.dedup as dd
from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _emb_matrix() -> np.ndarray:
    t = pq.read_table(f"{SF}/embeddings.parquet")
    return np.asarray(t["embedding"].to_pylist(), dtype=np.float64)


class TestEventTransitions:
    def test_matches_pandas_groundtruth(self, ray_session):
        got = q.q_event_transitions(SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        ev["prev"] = ev.groupby("user_id")["event_type"].shift(1)
        truth = (
            ev.dropna(subset=["prev"])
            .groupby(["prev", "event_type"])
            .size()
            .reset_index(name="n")
        )
        gm = {
            (r.prev_type, r.next_type): r.n for r in got.itertuples()
        }
        tm = {(r.prev, r.event_type): r.n for r in truth.itertuples()}
        assert gm == tm
        # conservation: one transition per event after each user's first
        n_users = ev["user_id"].nunique()
        assert sum(gm.values()) == len(ev) - n_users


class TestEmbedStandardize:
    def test_zscores_match_numpy(self, ray_session):
        got = q.q_embed_standardize(SF).to_pandas()
        X = _emb_matrix()
        m = X.sum(axis=0) / len(X)
        sd = np.sqrt(np.maximum((X * X).sum(axis=0) / len(X) - m * m, 0.0))
        safe = np.where(sd == 0.0, 1.0, sd)
        Z = np.round((X - m) / safe, 6)
        Z = np.where(sd[None, :] == 0.0, 0.0, Z)
        t = pq.read_table(f"{SF}/embeddings.parquet")
        vec_ids = t["vec_id"].to_pylist()
        piv = got.set_index(["vec_id", "pos"])["z"]
        for row, vid in enumerate(vec_ids[:50]):
            for pos in (1, 17, 64):
                assert piv[(vid, pos)] == Z[row, pos - 1]
        # standardized moments: mean 0, population std 1 per live dim
        zm = got.groupby("pos")["z"].mean()
        zs = got.groupby("pos")["z"].std(ddof=0)
        assert np.allclose(zm.values, 0.0, atol=1e-5)
        live = sd > 0
        assert np.allclose(zs.values[live], 1.0, atol=1e-4)


class TestEmbedCovariance:
    def test_matches_numpy_cov(self, ray_session):
        got = q.q_embed_covariance(SF).to_pandas()
        X = _emb_matrix()
        C = np.cov(X, rowvar=False, ddof=0)
        assert len(got) == 64 * 65 // 2
        for r in got.itertuples():
            assert abs(r.cov - C[r.i - 1, r.j - 1]) < 2e-6
        # upper triangle only, 1-based
        assert (got["i"] <= got["j"]).all()
        assert got["i"].min() == 1 and got["j"].max() == 64


class TestCopySearch:
    def test_topk_matches_bruteforce(self, ray_session):
        got = q.q_copy_search(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        qid = docs["doc_id"].min()
        qset = set(
            dd._shingles(docs.loc[docs.doc_id == qid, "text"].iloc[0] or "")
        )
        scores = sorted(
            (
                (-len(qset.intersection(dd._shingles(r.text or ""))), r.doc_id)
                for r in docs.itertuples()
                if r.doc_id != qid
            )
        )[: q.COPY_SEARCH_K]
        expect = [(-s, i) for s, i in scores]
        assert list(zip(got["n_common"], got["doc_id"])) == expect
        assert (got["n_query"] == len(qset)).all()
        assert (got["n_common"] <= got["n_query"]).all()
        assert qid not in set(got["doc_id"])


class TestSignalCorrelation:
    def test_matches_numpy_corrcoef(self, ray_session):
        got = q.q_signal_correlation(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        import re

        c = docs["text"].str.len().to_numpy(dtype=np.int64)
        tk = docs["text"].map(
            lambda s: len(re.findall(r"\S+", s or ""))
        ).to_numpy(dtype=np.int64)
        dg = docs["text"].map(
            lambda s: len(set(dd._tokens(s or "")))
        ).to_numpy(dtype=np.int64)
        sig = {"chars": c, "tokens": tk, "types": dg}
        assert len(got) == 3
        for r in got.itertuples():
            expect = np.corrcoef(sig[r.sig_a], sig[r.sig_b])[0, 1]
            assert abs(r.corr - expect) < 1e-5
        # correlations are true correlations: bounded and non-degenerate
        assert (got["corr"].abs() <= 1.0).all()
