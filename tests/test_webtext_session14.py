"""Unit tests for the session-14 operators: margin-based bitext mining
(xlang_mine) and lexicon topic tagging (topic_tag). Oracle value-parity
is covered by the driver gate / check_oracles; these pin the semantics
the SQL compare can't isolate (margin recurrence, neighborhood ranking,
argmax tie-breaks) against driver-side brute force.
"""

import numpy as np
import pyarrow.parquet as pq

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _lang_side(lang: str):
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    ids = set(docs[docs["lang"] == lang]["doc_id"])
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    emb = emb[emb["vec_id"].isin(ids)].sort_values("vec_id")
    M = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb["embedding"]])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    return emb["vec_id"].to_numpy(), M


class TestXlangMine:
    def test_matches_bruteforce_margin(self, ray_session):
        df = q.QUERIES["xlang_mine"](SF).to_pandas()
        sids, S = _lang_side(q.XLANG_SRC)
        tids, T = _lang_side(q.XLANG_TGT)
        s4 = np.rint(np.round(S @ T.T, 4) * 10000).astype(np.int64)
        kk = min(q.XLANG_K, len(tids))
        expect = {}
        for i, sid in enumerate(sids):
            # rank by (sim desc, tgt_id asc); tids is sorted ascending
            order = np.lexsort((np.arange(len(tids)), -s4[i]))
            top = order[:kk]
            margin = kk * int(s4[i, top[0]]) - int(s4[i, top].sum())
            if margin >= q.XLANG_TAU_1E4:
                expect[int(sid)] = (int(tids[top[0]]), int(s4[i, top[0]]),
                                    margin)
        got = {
            int(r.src_id): (int(r.tgt_id), int(r.sim_1e4),
                            int(r.margin_1e4))
            for r in df.itertuples()
        }
        assert got == expect
        assert expect, "fixture must yield at least one mined pair"
        # and the threshold must actually filter something
        assert len(expect) < len(sids)

    def test_pairs_cross_languages(self, ray_session):
        df = q.QUERIES["xlang_mine"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "lang"]).to_pandas()
        lang = docs.set_index("doc_id")["lang"]
        assert (lang.loc[df["src_id"]].to_numpy() == q.XLANG_SRC).all()
        assert (lang.loc[df["tgt_id"]].to_numpy() == q.XLANG_TGT).all()


class TestTopicTag:
    def test_matches_bruteforce_counts(self, ray_session):
        df = q.QUERIES["topic_tag"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        assert len(df) == len(docs)
        w2t = {}
        for tp, ws in q.TOPIC_LEXICON.items():
            for w in ws:
                w2t.setdefault(w, []).append(tp)
        got = df.set_index("doc_id")
        for r in docs.itertuples():
            counts = {tp: 0 for tp in q.TOPIC_LEXICON}
            for w in r.text.split():
                for tp in w2t.get(w, ()):
                    counts[tp] += 1
            mx = max(counts.values())
            best = (min(t for t, n in counts.items() if n == mx)
                    if mx else "none")
            assert got.loc[r.doc_id, "topic"] == best
            assert got.loc[r.doc_id, "hits"] == mx

    def test_multiple_topics_present(self, ray_session):
        df = q.QUERIES["topic_tag"](SF).to_pandas()
        assert df["topic"].nunique() >= 2
