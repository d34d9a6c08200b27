"""Unit tests for the session-18 operators: Matryoshka truncation audit
(full- vs half-dimension cosine top-k overlap) and the event-type
Markov stationary distribution. Oracle value-parity is covered by the
driver gate / check_oracles; these pin the numeric semantics against
independent numpy/python ground truth, plus the invariants the designs
rely on (overlap bounded by k; stationary mass conservation up to the
integer-floor dust and dangling-state leak).
"""

import numpy as np
import pyarrow.parquet as pq

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _topk_ids(Q: np.ndarray, X: np.ndarray, ids: np.ndarray,
              k: int) -> list[list[int]]:
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    sims = np.round(Qn @ Xn.T, 4)
    out = []
    for qi in range(sims.shape[0]):
        order = sorted(range(sims.shape[1]),
                       key=lambda j: (-sims[qi, j], ids[j]))[:k]
        out.append([int(ids[j]) for j in order])
    return out


class TestEmbedMatryoshka:
    def test_matches_numpy_groundtruth(self, ray_session):
        got = (
            q.q_embed_matryoshka(SF)
            .to_pandas()
            .set_index("query_id")
            .sort_index()
        )
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]
        qids = ids[: q.N_QUERIES]
        Qf, Qh = X[: q.N_QUERIES], X[: q.N_QUERIES, : q.MRL_HALF]

        full = _topk_ids(Qf, X, ids, q.KNN_K)
        half = _topk_ids(Qh, X[:, : q.MRL_HALF], ids, q.KNN_K)
        assert len(got) == q.N_QUERIES
        for qi, qid in enumerate(qids):
            row = got.loc[int(qid)]
            want = len(set(full[qi]) & set(half[qi]))
            assert row["n_overlap"] == want
            assert 0 <= row["n_overlap"] <= row["k"] == q.KNN_K

    def test_self_is_always_shared(self, ray_session):
        # a query vector's own id tops both rankings (cos=1.0 in both
        # the full and the truncated space), so overlap is >= 1
        got = q.q_embed_matryoshka(SF).to_pandas()
        assert (got["n_overlap"] >= 1).all()


class TestEventStationary:
    def test_matches_python_groundtruth(self, ray_session):
        tr = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in q.q_event_transitions(SF).take_all()
        }
        states = sorted({a for a, _ in tr} | {b for _, b in tr})
        tot: dict[str, int] = {}
        for (a, _), n in tr.items():
            tot[a] = tot.get(a, 0) + n
        p = {s: q.EV_STAT_SCALE // len(states) for s in states}
        for _ in range(q.EV_STAT_ITERS):
            nxt = {s: 0 for s in states}
            for (a, b), n in tr.items():
                nxt[b] += (p[a] * n) // tot[a]
            p = nxt
        got = (
            q.q_event_stationary(SF)
            .to_pandas()
            .set_index("event_type")["stationary_micro"]
        )
        assert set(got.index) == set(states)
        for s in states:
            assert got[s] == p[s] // 10**6

    def test_mass_conserved_up_to_floor_dust(self, ray_session):
        # each round loses < 1 unit per (state, edge) to floor division
        # and the full mass of dangling states; with every event type
        # having outgoing transitions in the fixture, total stationary
        # mass must stay within iters * states^2 units of the scale
        got = q.q_event_stationary(SF).to_pandas()
        total = int(got["stationary_micro"].sum()) * 10**6
        n = len(got)
        slack = q.EV_STAT_ITERS * (n * n + n) * 10**6 + n * 10**6
        assert q.EV_STAT_SCALE - total < q.EV_STAT_SCALE * 0.05 + slack
        assert total <= q.EV_STAT_SCALE
