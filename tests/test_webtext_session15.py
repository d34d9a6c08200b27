"""Unit tests for the session-15 operators: SimHash Hamming near-dup
pairs/clusters (Manku et al. WWW'07 banding), cross-corpus incremental
near-dedup, integer-exact Flesch readability, and the size-routed
attach_pair_texts broadcast path. Oracle value-parity is covered by the
driver gate / check_oracles; these pin the semantics the SQL compare
can't isolate (popcount verify, skew degradation bounds, route
equivalence, truncating division parity).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import adaptive_pdf_extractor_ray.stages.dedup as dd
import adaptive_pdf_extractor_ray.stages.text as tx
from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class TestSimhashBucketPairs:
    def _group(self, ids, sims):
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(sims, pa.uint64()),
            }
        )

    def test_exact_under_cap_matches_bruteforce(self):
        rng = np.random.RandomState(7)
        base = int(rng.randint(0, 1 << 62))
        # cluster of near signatures + distant noise
        sims = [base, base ^ 0b1, base ^ 0b110, base ^ (1 << 40)]
        sims += [int(x) for x in
                 rng.randint(0, 1 << 62, size=20, dtype=np.int64)]
        ids = list(range(len(sims)))
        out = dd.simhash_bucket_pairs(self._group(ids, sims)).to_pydict()
        got = {(a, b): h for a, b, h in
               zip(out["a"], out["b"], out["hamming"])}
        expect = {}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = _ham(sims[i], sims[j])
                if h <= dd.SIMHASH_MAX_HAM:
                    expect[(i, j)] = h
        assert got == expect
        assert expect, "fixture must produce at least one pair"

    def test_overcap_identical_star_and_bounded_output(self):
        # 50 identical + 50 identical (other value) + 10 noise, cap 20:
        # stars cover the identical docs, output stays O(n), no C(n,2)
        sims = [123456789] * 50 + [987654321] * 50
        sims += [int(x) for x in
                 np.random.RandomState(3).randint(1 << 30, 1 << 62, 10)]
        ids = list(range(len(sims)))
        out = dd.simhash_bucket_pairs(
            self._group(ids, sims), max_bucket=20
        ).to_pydict()
        n_pairs = len(out["a"])
        # 49 + 49 star pairs + <= reps*8 neighbor pairs, never ~C(110,2)
        assert n_pairs < 49 + 49 + 12 * 8
        star = [(a, b) for a, b, h in
                zip(out["a"], out["b"], out["hamming"]) if h == 0]
        assert (0, 1) in star and (50, 51) in star
        assert len(star) >= 98
        # every emitted pair is genuinely within the Hamming bound
        for a, b, h in zip(out["a"], out["b"], out["hamming"]):
            assert _ham(sims[a], sims[b]) == h <= dd.SIMHASH_MAX_HAM

    def test_pigeonhole_blocking_finds_all_ham3_pairs(self, ray_session):
        """End-to-end: band blocking + verify == full-corpus brute force
        (banding is lossless for Hamming <= 3 by pigeonhole)."""
        df = q.QUERIES["dedup_simhash_pairs"](SF).to_pandas()
        sigs = q.QUERIES["dedup_simhash"](SF).to_pandas()
        s = dict(zip(sigs["doc_id"], sigs["simhash"]))
        expect = {}
        ids = sorted(s)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = _ham(int(s[a]), int(s[b]))
                if h <= dd.SIMHASH_MAX_HAM:
                    expect[(a, b)] = h
        got = {(int(r.a), int(r.b)): int(r.hamming)
               for r in df.itertuples()}
        assert got == expect
        assert expect


class TestCrossBucketPairs:
    def test_exact_cross_only(self):
        g = pa.table({"doc_id": pa.array([0, 1, 2, 3, 6, 9], pa.int64())})
        out = dd.cross_bucket_pairs(g, split_mod=3).to_pydict()
        pairs = set(zip(out["a"], out["b"]))
        assert pairs == {(a, b) for a in (0, 3, 6, 9) for b in (1, 2)}

    def test_one_sided_bucket_empty(self):
        g = pa.table({"doc_id": pa.array([1, 2, 4, 5], pa.int64())})
        out = dd.cross_bucket_pairs(g, split_mod=3)
        assert out.num_rows == 0
        assert out.column_names == ["a", "b"]

    def test_overcap_fanout_bounded(self):
        ids = list(range(3000))
        g = pa.table({"doc_id": pa.array(ids, pa.int64())})
        out = dd.cross_bucket_pairs(g, split_mod=3, max_side=100, fan_k=8)
        n_new = len([i for i in ids if i % 3 == 0])
        assert out.num_rows == n_new * 8
        assert set(np.asarray(out["a"]) % 3) == {0}
        assert 0 not in set(np.asarray(out["b"]) % 3)

    def test_query_outputs_new_docs_with_base_matches(self, ray_session):
        df = q.QUERIES["dedup_cross_corpus"](SF).to_pandas()
        assert len(df) > 0
        assert (df["new_doc_id"] % q.CROSS_MOD == 0).all()
        assert (df["match_doc_id"] % q.CROSS_MOD != 0).all()
        assert (df["n_matches"] >= 1).all()


class TestAttachPairTextsRoutes:
    def test_broadcast_equals_join_route(self, ray_session):
        import ray.data as rd

        docs_tbl = pq.read_table(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
        docs = rd.from_arrow(docs_tbl)
        ids = docs_tbl["doc_id"].to_pylist()
        pairs_tbl = pa.table(
            {
                "a": pa.array(ids[0:40:2], pa.int64()),
                "b": pa.array(ids[1:41:2], pa.int64()),
            }
        )
        broadcast = dd.attach_pair_texts(
            rd.from_arrow(pairs_tbl), docs
        ).to_pandas()
        joined = dd.attach_pair_texts(
            rd.from_arrow(pairs_tbl), docs, num_partitions=2
        ).to_pandas()
        key = ["a", "b"]
        b = broadcast.sort_values(key).reset_index(drop=True)
        j = joined[b.columns].sort_values(key).reset_index(drop=True)
        assert b.equals(j)
        assert len(b) == 20

    def test_empty_pairs_returns_typed_empty(self, ray_session):
        import ray.data as rd

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["x"], pa.string())})
        )
        pairs = rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
        )
        out = dd.attach_pair_texts(pairs, docs)
        assert out.count() == 0
        assert set(out.schema().names) == {"a", "b", "text_a", "text_b"}


class TestReadability:
    def test_tdiv_matches_duckdb_truncation(self):
        import duckdb

        cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 5), (123457, 7)]
        con = duckdb.connect()
        for num, den in cases:
            sql = con.sql(
                f"select ({num}::hugeint) // ({den}::hugeint)"
            ).fetchone()[0]
            assert tx._tdiv(num, den) == int(sql), (num, den)

    def test_flesch_formula(self):
        b = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": ["The cat sat on the mat. It was happy!"],
            }
        )
        out = tx.readability_batch(b).to_pydict()
        w, s, syl = out["n_words"][0], out["n_sentences"][0], \
            out["n_syllables"][0]
        assert (w, s) == (9, 2)
        expect = tx._tdiv(206835 * s * w - 1015 * w * w - 84600 * syl * s,
                          s * w)
        assert out["flesch_milli"][0] == expect

    def test_empty_doc_defined(self):
        b = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [""]})
        out = tx.readability_batch(b).to_pydict()
        assert out["flesch_milli"][0] == 206835 - 1015  # W=S=1, Syl=0


class TestScriptMix:
    def test_counts_match_python_bruteforce(self, ray_session):
        import re as _re

        df = q.QUERIES["script_mix"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        got = df.set_index("doc_id")
        pats = {
            "n_latin": _re.compile(r"[A-Za-z]"),
            "n_cyrillic": _re.compile("[Ѐ-ӿ]"),
            "n_cjk": _re.compile("[一-鿿]"),
            "n_digit": _re.compile(r"[0-9]"),
        }
        for r in docs.itertuples():
            page = (r.text + " " + q.SCRIPT_CYR * (r.doc_id % 3)
                    + q.SCRIPT_CJK * (r.doc_id % 4) + "42 " * (r.doc_id % 2))
            row = got.loc[r.doc_id]
            counts = {k: len(p.findall(page)) for k, p in pats.items()}
            for k, v in counts.items():
                assert row[k] == v, (r.doc_id, k)
            total = max(sum(counts.values()), 1)
            assert row["nonlatin_ppm"] == (
                (counts["n_cyrillic"] + counts["n_cjk"]) * 1_000_000 // total
            )
        # the injection must exercise every script class somewhere
        assert (df["n_cyrillic"] > 0).any()
        assert (df["n_cjk"] > 0).any()
        assert set(df["dominant_script"]) >= {"latin"}


class TestDomTemplates:
    def test_groups_match_bruteforce(self, ray_session):
        import hashlib

        df = q.QUERIES["dom_templates"](SF).to_pandas()
        import glob

        pages = pq.read_table(
            next(iter(glob.glob(q.link_corpus() + "/*.parquet"))),
            columns=["url", "html"],
        )
        expect: dict = {}
        for u, h in zip(pages["url"].to_pylist(),
                        pages["html"].to_pylist()):
            tags = q.DOM_TAG_RE.findall(h.decode())
            host = u.split("://", 1)[1].split("/", 1)[0]
            k = (host, hashlib.md5(">".join(tags).encode()).hexdigest())
            ent = expect.setdefault(k, [0, u])
            ent[0] += 1
            ent[1] = min(ent[1], u)
        got = {
            (r.host, r.struct_md5): [int(r.n_pages), r.sample_url]
            for r in df.itertuples()
        }
        assert got == expect
        # template clustering is non-trivial: some template repeats
        assert any(v[0] > 1 for v in expect.values())


class TestBpeEncode:
    def test_matches_bruteforce_encode(self, ray_session):
        df = q.QUERIES["bpe_encode"](SF).to_pandas()
        merges = [
            (r.left_sym, r.right_sym)
            for r in q.QUERIES["bpe_train"](SF).to_pandas()
                      .sort_values("merge_idx").itertuples()
        ]
        assert len(merges) == q.BPE_MERGES

        def enc_len(w: str) -> int:
            s = list(w) + ["</w>"]
            for a, b in merges:
                r, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        r.append(a + b)
                        i += 2
                    else:
                        r.append(s[i])
                        i += 1
                s = r
            return len(s)

        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        got = df.set_index("doc_id")
        for r in docs.itertuples():
            words = [w for w in r.text.split(" ") if w]
            if not words:
                assert r.doc_id not in got.index
                continue
            total = sum(
                enc_len(w)
                if (w.isascii() and w.isalpha() and w.islower()) else 1
                for w in words
            )
            assert got.loc[r.doc_id, "n_words"] == len(words)
            assert got.loc[r.doc_id, "n_bpe_tokens"] == total
        # merges must actually compress: fewer symbols than raw chars+1
        raw = sum(
            len(w) + 1
            for t in docs["text"] for w in t.split(" ")
            if w and w.isascii() and w.isalpha() and w.islower()
        )
        assert df["n_bpe_tokens"].sum() < raw + len(docs)


class TestDedupPrefix:
    def test_groups_match_bruteforce(self, ray_session):
        import hashlib

        df = q.QUERIES["dedup_prefix"](SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        groups: dict = {}
        for r in docs.itertuples():
            toks = [w for w in r.text.split(" ") if w][:q.PREFIX_K]
            h = hashlib.md5(" ".join(toks).encode()).hexdigest()
            g = groups.setdefault(h, [0, r.doc_id])
            g[0] += 1
            g[1] = min(g[1], r.doc_id)
        expect = {h: v for h, v in groups.items() if v[0] >= 2}
        got = {r.prefix_md5: [int(r.n_docs), int(r.keep_doc_id)]
               for r in df.itertuples()}
        assert got == expect
        assert expect, "fixture must contain truncation duplicates"


class TestTrustRank:
    def test_routes_value_identical_and_seeds_hold_trust(
        self, ray_session
    ):
        pages_dir = q.link_corpus()
        a = pa.table(
            q._pagerank_driver(pages_dir, q.LINK_N, iters=2,
                               seed_fn=q._trust_seed,
                               out_col="trustrank")
        ).to_pandas().sort_values("url").reset_index(drop=True)
        b = q._pagerank_distributed(
            pages_dir, q.LINK_N, iters=2,
            seed_fn=q._trust_seed, out_col="trustrank",
        ).to_pandas().sort_values("url").reset_index(drop=True)
        assert a["url"].tolist() == b["url"].tolist()
        assert a["trustrank"].tolist() == b["trustrank"].tolist()

    def test_trust_concentrates_on_seed_neighborhood(self, ray_session):
        df = q.QUERIES["trustrank"](SF).to_pandas()
        assert len(df) == q.LINK_N
        seeds = df[df["url"].map(q._trust_seed)]
        others = df[~df["url"].map(q._trust_seed)]
        # teleport goes only to seeds: their mean trust must exceed
        # the non-seed mean (the fixture graph is well connected, so
        # non-seeds still receive propagated trust > 0 via links)
        assert seeds["trustrank"].mean() > others["trustrank"].mean()
        assert (others["trustrank"] > 0).any()

    def test_uniform_seed_equals_pagerank(self, ray_session):
        pages_dir = q.link_corpus()
        plain = pa.table(
            q._pagerank_driver(pages_dir, q.LINK_N, iters=2)
        ).to_pandas()
        seeded = pa.table(
            q._pagerank_driver(pages_dir, q.LINK_N, iters=2,
                               seed_fn=lambda u: True)
        ).to_pandas()
        assert plain["pagerank"].tolist() == seeded["pagerank"].tolist()


class TestAnnRecall:
    def test_matches_set_intersection(self, ray_session):
        df = q.QUERIES["ann_recall"](SF).to_pandas()
        brute = q.QUERIES["knn_brute"](SF).to_pandas()
        ann = q.QUERIES["knn_lsh"](SF).to_pandas()
        truth = brute.groupby("query_id")["neighbor_id"].apply(set)
        got_ann = ann.groupby("query_id")["neighbor_id"].apply(set)
        assert len(df) == len(truth)
        for r in df.itertuples():
            t = truth[r.query_id]
            a = got_ann.get(r.query_id, set())
            hits = len(t & a)
            assert r.k_truth == len(t)
            assert r.n_hits == hits
            assert r.recall_ppm == hits * 1_000_000 // len(t)
        # the index must find SOMETHING but is lossy by design
        assert df["n_hits"].sum() > 0


class TestAnnRecallTune:
    def test_retuned_index_recall_at_realistic_density(self, ray_session):
        """The 6x8 re-tune (chosen with the q_ann_recall sweep) must
        hold recall@5 >= 0.7 at sf0.01 density — the old 2x6 config
        measured 0.58 at the same ~22% scan fraction."""
        df = q.QUERIES["ann_recall"]("/root/testdata/sf0.01").to_pandas()
        assert df["recall_ppm"].mean() / 1e6 >= 0.7
