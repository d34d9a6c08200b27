"""Unit tests for the session-13 operators: DLT priority sampling,
URL-template mining / crawler-trap detection, the exact set-similarity
join's salted-distinct helper. (Oracle value-parity is covered by the
driver gate / check_oracles; these pin semantics the SQL compare can't
isolate.)
"""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


class TestSampleWeighted:
    def test_matches_bruteforce_priorities(self, ray_session):
        df = q.QUERIES["sample_weighted"](SF).to_pandas()
        assert len(df) == q.SAMPLE_W_K

        tbl = pq.read_table(f"{SF}/documents.parquet",
                            columns=["doc_id", "n_chars"])
        ids = tbl["doc_id"].to_pylist()
        w = np.asarray(tbl["n_chars"].to_pylist(), dtype=np.float64)
        hv1 = np.array(
            [int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) + 1
             for d in ids],
            dtype=np.float64,
        )
        p = w / hv1
        order = sorted(range(len(ids)), key=lambda i: (-p[i], ids[i]))
        want_ids = [ids[i] for i in order[: q.SAMPLE_W_K]]
        assert df["doc_id"].tolist() == want_ids

        # DLT threshold estimator: est_w = max(w, tau), tau = (k+1)-th pri
        tau = p[order[q.SAMPLE_W_K]]
        want_est = np.maximum(w[order[: q.SAMPLE_W_K]], tau).round(6)
        assert np.allclose(df["est_w"].to_numpy(), want_est)
        assert (df["est_w"] >= df["n_chars"] - 1e-9).all()

    def test_weight_proportionality(self, ray_session):
        # heavy docs must be over-represented vs the uniform reservoir:
        # mean weight of the weighted sample > corpus mean weight
        df = q.QUERIES["sample_weighted"](SF).to_pandas()
        tbl = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
        corpus_mean = np.mean(tbl["n_chars"].to_pylist())
        assert df["n_chars"].mean() > corpus_mean


class TestUrlTemplates:
    def test_trap_flags_and_counts(self, ray_session):
        df = (
            q.QUERIES["url_templates"](SF)
            .to_pandas()
            .set_index("template")
            .sort_index()
        )
        assert len(df) == 3
        cal = df.loc["https://cal.example/events/N/N/N?page=V"]
        forum = df.loc["https://forum.example/viewtopic.php?t=V&sid=V"]
        news = df.loc["https://news.example/article/story-N"]
        # calendar crossproduct repeats (lcm of the moduli < family size)
        assert cal["n_urls"] == 140 and cal["n_texts"] == 3 and cal["trap"]
        assert forum["n_urls"] == 200 and forum["n_texts"] == 10
        assert bool(forum["trap"])
        # articles: one body per url -> clean
        assert news["n_urls"] == 200 and news["n_texts"] == 200
        assert not news["trap"]

    def test_template_normalization(self):
        import re

        def tmpl(u):
            return re.sub(r"[0-9]+", "N", re.sub(r"=[^&#]*", "=V", u))

        assert tmpl("https://a.example/x/2024/5/7?page=3") == \
            "https://a.example/x/N/N/N?page=V"
        assert tmpl("https://f.example/t.php?t=9&sid=ab3f9c") == \
            "https://f.example/t.php?t=V&sid=V"
        # fragment and ampersand stop the value run
        assert tmpl("https://a.example/p?x=1&y=2#frag") == \
            "https://a.example/p?x=V&y=V#frag"


class TestDistinctRows:
    def test_exact_distinct(self, ray_session):
        import ray.data as rd

        t = pa.table(
            {
                "k": pa.array(["a", "a", "b", "b", "b", "c"], pa.string()),
                "v": pa.array(["1", "1", "2", "2", "3", "4"], pa.string()),
            }
        )
        out = q._distinct_rows(rd.from_arrow(t), ["k", "v"]).to_pandas()
        got = set(zip(out["k"], out["v"]))
        assert got == {("a", "1"), ("b", "2"), ("b", "3"), ("c", "4")}


class TestSyndicationPairs:
    def test_edges_match_pair_sources(self, ray_session):
        pairs = q.QUERIES["setsim_join"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "source"]).to_pandas()
        src = dict(zip(docs["doc_id"], docs["source"]))
        want: dict = {}
        for a, b in zip(pairs["a"], pairs["b"]):
            k = tuple(sorted((src[a], src[b])))
            want[k] = want.get(k, 0) + 1
        got = q.QUERIES["syndication_pairs"](SF).to_pandas()
        got_map = {
            (r.src_a, r.src_b): r.n_pairs for r in got.itertuples()
        }
        assert got_map == want
        assert (got["src_a"] <= got["src_b"]).all()


class TestSkewF2:
    def test_exact_and_bounded_error(self, ray_session):
        from adaptive_pdf_extractor_ray.stages import sketch as sk

        df = q.QUERIES["skew_f2"](SF).to_pandas()
        assert len(df) == 1
        row = df.iloc[0]
        ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
        from collections import Counter

        c = Counter(v for v in ev["user_id"].to_pylist() if v is not None)
        exact = sum(n * n for n in c.values())
        assert row["exact_f2"] == exact
        assert row["k"] == sk.AMS_K
        # AMS with 64 counters: rel error is tens of percent, not silly
        assert row["rel_err"] < 0.5
        assert abs(row["rel_err"] - abs(row["est_f2"] - exact) / exact) < 1e-6

    def test_partials_merge_law(self):
        """Sketch partials merge by addition: splitting a batch must give
        the same merged counters as one pass (the mergeability the
        distributed groupby relies on)."""
        import pyarrow as pa

        from adaptive_pdf_extractor_ray.stages import sketch as sk

        vals = [1, 2, 2, 3, 3, 3, 7, 7, 9]
        whole = sk.ams_partial_batch(
            pa.table({"u": pa.array(vals, pa.int64())}), "u"
        )
        p1 = sk.ams_partial_batch(
            pa.table({"u": pa.array(vals[:4], pa.int64())}), "u"
        )
        p2 = sk.ams_partial_batch(
            pa.table({"u": pa.array(vals[4:], pa.int64())}), "u"
        )
        merged = [
            a + b for a, b in zip(p1["s"].to_pylist(), p2["s"].to_pylist())
        ]
        assert merged == whole["s"].to_pylist()


class TestPhraseSearch:
    def test_matches_token_scan(self, ray_session):
        got = q.QUERIES["phrase_search"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        want = {}
        for did, txt in zip(docs["doc_id"].to_pylist(),
                            docs["text"].to_pylist()):
            toks = (txt or "").split(" ")
            for ph in q.PHRASES:
                w = ph.split()
                n = sum(
                    1 for i in range(len(toks) - 2)
                    if toks[i:i + 3] == w
                )
                if n:
                    want[(ph, did)] = n
        got_map = {(r.phrase, r.doc_id): r.n_occ for r in got.itertuples()}
        assert got_map == want
        assert want, "fixture must contain at least one phrase hit"

    def test_overlapping_occurrences(self, ray_session, tmp_path):
        # 'a b a b a' contains 'a b a' twice (overlap-aware counting)
        pq.write_table(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(
                          ["the fast key fast key the fast key"],
                          pa.string())}),
            tmp_path / "documents.parquet",
        )
        got = q.QUERIES["phrase_search"](str(tmp_path)).to_pandas()
        row = got[got["phrase"] == "the fast key"]
        assert row["n_occ"].tolist() == [2]


class TestDedupEvalExact:
    def test_metrics_consistent(self, ray_session):
        df = q.QUERIES["dedup_eval_exact"](SF).to_pandas()
        row = df.iloc[0]
        assert row["tp"] <= min(row["n_pred"], row["n_true"])
        assert row["n_true"] == len(q.QUERIES["setsim_join"](SF).to_pandas())
        assert row["precision_ppm"] == row["tp"] * 1_000_000 // row["n_pred"]
        assert row["recall_ppm"] == row["tp"] * 1_000_000 // row["n_true"]
        # on the planted fixture LSH at J>=0.6 should catch most pairs
        assert row["recall_ppm"] > 500_000


class TestDecayedCounts:
    def test_exact_integer_decay(self, ray_session):
        df = q.QUERIES["decayed_counts"](SF).to_pandas()
        ev = pq.read_table(f"{SF}/events.parquet",
                           columns=["ts", "event_type"])
        us = ev["ts"].cast("int64").to_numpy()
        ref = us.max()
        k = np.minimum((ref - us) // q.DECAY_HALFLIFE_US, 30)
        w = 1_000_000 >> k
        want = {}
        for et, wi in zip(ev["event_type"].to_pylist(), w):
            a, b = want.get(et, (0, 0))
            want[et] = (a + int(wi), b + 1)
        got = {r.event_type: (r.decayed_micro, r.n_events)
               for r in df.itertuples()}
        assert got == want
        # freshness: the newest event carries full weight, so the score
        # is positive for every type that has a recent event
        assert max(v[0] for v in got.values()) >= 1_000_000


class TestSampleWeightedStratified:
    def test_per_source_bruteforce(self, ray_session):
        df = q.QUERIES["sample_weighted_stratified"](SF).to_pandas()
        docs = pq.read_table(
            f"{SF}/documents.parquet",
            columns=["doc_id", "source", "n_chars"]).to_pandas()
        hv1 = docs["doc_id"].map(
            lambda d: int(
                hashlib.md5(str(d).encode()).hexdigest()[:15], 16) + 1)
        docs["p"] = docs["n_chars"] / hv1.astype(float)
        for src, g in docs.groupby("source"):
            g = g.sort_values(["p", "doc_id"],
                              ascending=[False, True])
            want_ids = g["doc_id"].head(q.SAMPLE_WS_K).tolist()
            got = df[df["source"] == src].sort_values(
                "pri", ascending=False)
            assert got["doc_id"].tolist() == want_ids
            tau = (g["p"].iloc[q.SAMPLE_WS_K]
                   if len(g) > q.SAMPLE_WS_K else 0.0)
            want_est = np.maximum(
                g["n_chars"].head(q.SAMPLE_WS_K).to_numpy(float), tau
            ).round(6)
            assert np.allclose(
                got["est_w"].to_numpy(), want_est)
        assert df.groupby("source").size().eq(q.SAMPLE_WS_K).all()


class TestEmbedProject:
    def test_norm_preservation_in_expectation(self, ray_session):
        df = q.QUERIES["embed_project"](SF).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        emb = pq.read_table(f"{SF}/embeddings.parquet",
                            columns=["vec_id", "embedding"]).to_pandas()
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        P = df[[f"p{c}" for c in range(q.JL_OUT_DIMS)]].to_numpy()
        # signed JL with scale 1/4: E[||Px||^2] = (k_out/16)||x||^2 = 0.25
        ratio = (P ** 2).sum(axis=1) / (V ** 2).sum(axis=1)
        assert 0.15 < ratio.mean() < 0.35

    def test_matches_sequential_sum(self, ray_session):
        df = q.QUERIES["embed_project"](SF).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        emb = pq.read_table(f"{SF}/embeddings.parquet",
                            columns=["vec_id", "embedding"]).to_pandas()
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        signs = q._jl_signs()
        for i in range(5):
            v = emb["embedding"].iloc[i]
            for c in range(q.JL_OUT_DIMS):
                s = 0.0
                for d in range(q.EMBED_DIMS):
                    s = s + signs[c][d] * float(v[d])
                assert df[f"p{c}"].iloc[i] == round(0.25 * s, 6)


class TestNgramNovelty:
    def test_bruteforce_df(self, ray_session):
        from adaptive_pdf_extractor_ray.stages.dedup import _shingles

        df = q.QUERIES["ngram_novelty"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        sets = {d: set(_shingles(t or "")) for d, t in
                zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())}
        cnt: dict = {}
        for s in sets.values():
            for sh in s:
                cnt[sh] = cnt.get(sh, 0) + 1
        got = df.set_index("doc_id")
        for d, s in sets.items():
            if not s:
                assert d not in got.index
                continue
            uniq = sum(1 for sh in s if cnt[sh] == 1)
            assert got.loc[d, "n_shingles"] == len(s)
            assert got.loc[d, "n_unique"] == uniq
            assert got.loc[d, "novelty"] == round(uniq / len(s), 6)
        # near-dup planted docs must score low novelty: at least some
        # docs in the fixture share nearly all shingles
        assert (df["novelty"] < 0.3).any()
        assert (df["novelty"] > 0.7).any()


class TestMinhashEstimate:
    def test_estimator_tracks_exact_jaccard(self, ray_session):
        est = q.QUERIES["dedup_minhash_est"](SF).to_pandas()
        exact = q.QUERIES["dedup_ngram_jaccard"](SF).to_pandas()
        j = est.merge(exact, on=["a", "b"])
        assert len(j) == len(est) > 0
        # Broder estimator with 128 perms: std ~ sqrt(J(1-J)/128) < 0.05
        err = (j["est_jaccard"] - j["jaccard"]).abs()
        assert err.max() < 0.2
        assert err.mean() < 0.06
        # identical docs estimate exactly 1.0
        ones = j[j["jaccard"] == 1.0]
        if len(ones):
            assert (ones["est_jaccard"] == 1.0).all()


class TestWinsorize:
    def test_exact_percentile_clip(self, ray_session):
        df = q.QUERIES["winsorize_lengths"](SF).to_pandas()
        x = np.sort(pq.read_table(f"{SF}/documents.parquet",
                                  columns=["n_chars"])["n_chars"]
                    .to_numpy())
        n = len(x)
        lo, hi = x[(n - 1) * 1 // 100], x[(n - 1) * 99 // 100]
        assert df["clipped"].min() == lo or df["n_chars"].min() >= lo
        assert (df["clipped"] == df["n_chars"].clip(lo, hi)).all()
        assert (df["was_clipped"] == ((df["n_chars"] < lo)
                                      | (df["n_chars"] > hi))).all()
        assert df["was_clipped"].any()


class TestMirrorDomains:
    def test_components_match_pair_graph(self, ray_session):
        df = q.QUERIES["mirror_domains"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "source"]).to_pandas()
        all_sources = set(docs["source"])
        assert set(df["source"]) == all_sources
        # brute-force components over the syndication edges
        edges = q.QUERIES["syndication_pairs"](SF).to_pandas()
        adj: dict = {s: {s} for s in all_sources}
        for a, b in zip(edges["src_a"], edges["src_b"]):
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        seen, comps = set(), {}
        for s in sorted(all_sources):
            if s in seen:
                continue
            stack, comp = [s], set()
            while stack:
                x = stack.pop()
                if x in comp:
                    continue
                comp.add(x)
                stack.extend(adj[x] - comp)
            seen |= comp
            for x in comp:
                comps[x] = comp
        got = df.set_index("source")["mirror_rep"].to_dict()
        # same partition: two sources share an engine rep iff they share
        # a brute-force component
        for s in all_sources:
            for t in all_sources:
                same_engine = got[s] == got[t]
                same_brute = t in comps[s]
                assert same_engine == same_brute, (s, t)
        # at least one non-trivial mirror cluster exists in the fixture
        assert any(len(c) > 1 for c in comps.values())
