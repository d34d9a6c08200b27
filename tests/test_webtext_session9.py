"""Unit tests for the session-9 operators: mojibake audit, tokenizer
fertility, dup-cluster size distribution, distributed Lloyd k-means.
(Oracle value-parity is covered by the driver gate / check_oracles;
these pin the semantic invariants the SQL compare can't isolate.)
"""

import hashlib

import numpy as np
import pyarrow.parquet as pq

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


class TestMojibake:
    def test_injected_counts_and_flag(self, ray_session):
        df = q.QUERIES["mojibake"](SF).to_pandas()
        assert len(df) == 500
        # the raw fixture text is clean ASCII-ish: every marker comes
        # from the deterministic injection of 3 markers per repeat
        expected = (df["doc_id"] % 3) * 3
        assert (df["n_mojibake"] == expected).all()
        assert (df["damaged"] == (expected > 0).astype("int64")).all()


class TestTokenizerFertility:
    def test_fertility_at_least_one(self, ray_session):
        df = q.QUERIES["tokenizer_fertility"](SF).to_pandas()
        # every whitespace word yields >= 1 subword token, so fertility
        # is >= 1.0 (1e6 PPM) for every language
        assert (df["n_subtokens"] >= df["n_words"]).all()
        assert (df["fertility_ppm"] >= 1_000_000).all()
        # totals must cover the whole corpus token count
        tok = q.QUERIES["token_count"](SF).to_pandas()
        assert df["n_words"].sum() == tok["n_tokens"].sum()


class TestDupClusterSizes:
    def test_histogram_accounts_for_every_clustered_doc(self, ray_session):
        hist = q.QUERIES["dup_cluster_sizes"](SF).to_pandas()
        comp = q.QUERIES["dedup_minhash_clusters"](SF).to_pandas()
        # clusters come from verified pairs: size >= 2 always
        assert (hist["cluster_size"] >= 2).all()
        assert hist["n_docs"].sum() == len(comp)
        assert (
            hist["n_docs"] == hist["cluster_size"] * hist["n_clusters"]
        ).all()
        assert hist["n_clusters"].sum() == comp["rep_id"].nunique()


class TestKmeans:
    def test_partition_and_centroid_consistency(self, ray_session):
        df = q.QUERIES["kmeans"](SF).to_pandas()
        n_vecs = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
        dim = df["pos"].max()
        assert len(df) == q.KMEANS_K * dim
        # n_members is constant per cluster and partitions the corpus
        per = df.groupby("cluster")["n_members"].agg(["min", "max"])
        assert (per["min"] == per["max"]).all()
        assert per["min"].sum() == n_vecs
        assert df["value"].notna().all()
        assert np.isfinite(df["value"]).all()

    def test_matches_plain_numpy_lloyd(self, ray_session):
        """The distributed partial-sum dataflow must equal the
        single-process Lloyd loop with the same determinism recipe
        (distance at 4 dp, first-lowest-cluster argmin, centroids
        rounded to 6 dp per update, init = K lowest vec_ids)."""
        t = pq.read_table(f"{SF}/embeddings.parquet")
        vid = np.array(t["vec_id"])
        X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        order = np.argsort(vid)
        X = X[order]
        C = X[: q.KMEANS_K].copy()
        counts = np.zeros(q.KMEANS_K, dtype=np.int64)
        for _ in range(q.KMEANS_ITERS):
            d = np.round(
                np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)), 4
            )
            assign = d.argmin(axis=1)
            for k in range(q.KMEANS_K):
                m = assign == k
                counts[k] = m.sum()
                if counts[k]:
                    C[k] = np.round(X[m].mean(0), 6)
        df = (
            q.QUERIES["kmeans"](SF)
            .to_pandas()
            .sort_values(["cluster", "pos"])
            .reset_index(drop=True)
        )
        got = df["value"].to_numpy().reshape(q.KMEANS_K, -1)
        assert np.array_equal(got, C)
        got_n = (
            df.groupby("cluster")["n_members"].first().to_numpy()
        )
        assert np.array_equal(got_n, counts)


class TestClusterSample:
    def test_balanced_and_hash_ranked(self, ray_session):
        df = q.QUERIES["cluster_sample"](SF).to_pandas()
        km = q.QUERIES["kmeans"](SF).to_pandas()
        members = km.groupby("cluster")["n_members"].first()
        per = df.groupby("cluster")["vec_id"].count()
        # every cluster contributes min(Q, |cluster|) rows — balance,
        # not proportionality (n_members comes from the assignment that
        # produced the final centroids; the sample re-assigns WITH the
        # final centroids, so sizes can drift by a row near boundaries
        # — cap is the hard invariant, exact-Q holds with headroom)
        assert (per <= q.CLUSTER_SAMPLE_Q).all()
        full = members[members >= q.CLUSTER_SAMPLE_Q * 2].index
        assert (per.loc[full] == q.CLUSTER_SAMPLE_Q).all()
        # hash-rank determinism: rk really is md5(vec_id)
        recomputed = df["vec_id"].map(
            lambda v: hashlib.md5(str(v).encode()).hexdigest()
        )
        assert (df["rk"] == recomputed).all()


class TestQualityLogit:
    def test_short_docs_score_zero_and_flag_consistency(
        self, ray_session, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.parquet as pq_

        texts = ["", "ab", "hello world", "aaaaaa", "zzz quality text"]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 5, pa.string()),
                "source": pa.array(["t"] * 5, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq_.write_table(tbl, tmp_path / "documents.parquet")
        df = (
            q.QUERIES["quality_logit"](str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(df) == 5  # zero-trigram docs still emitted
        assert df.loc[0, "logit_ppm"] == 0 and df.loc[1, "logit_ppm"] == 0
        assert (df["keep"] == (df["logit_ppm"] > 0).astype("int64")).all()
        # independent recomputation for one doc (truncating division)
        W = q._logit_weights()
        s = "hello world"
        agg = {}
        for i in range(len(s) - 2):
            h = (
                int.from_bytes(
                    hashlib.md5(s[i : i + 3].encode()).digest()[:4], "big"
                )
                % q.HASH_FEATURE_BUCKETS
            )
            agg[h] = agg.get(h, 0) + 1
        raw = sum(n * W[b] for b, n in agg.items())
        total = sum(agg.values())
        expected = (abs(raw) // total) * (1 if raw >= 0 else -1)
        assert df.loc[2, "logit_ppm"] == expected

    def test_weights_are_bounded(self):
        W = q._logit_weights()
        assert len(W) == q.HASH_FEATURE_BUCKETS
        assert all(-500_000 <= w <= 500_000 for w in W.values())


class TestFilterAgreement:
    def test_matrix_consistent_with_both_filters(self, ray_session):
        m = q.QUERIES["filter_agreement"](SF).to_pandas()
        tiers = q.QUERIES["quality_tiers"](SF).to_pandas()
        logit = q.QUERIES["quality_logit"](SF).to_pandas()
        # cells partition the tiered docs; marginals match each filter
        assert m["n_docs"].sum() == len(tiers)
        tm = m.groupby("tier")["n_docs"].sum()
        assert tm.equals(
            tiers.groupby("tier")["doc_id"].count().rename("n_docs")
        )
        both = tiers.merge(logit, on="doc_id")
        km = m.groupby("keep")["n_docs"].sum()
        assert km.equals(
            both.groupby("keep")["doc_id"].count().rename("n_docs")
        )


class TestSplitTokenBudget:
    def test_budget_partitions_the_corpus(self, ray_session):
        df = q.QUERIES["split_token_budget"](SF).to_pandas()
        splits = q.QUERIES["split_assign"](SF).to_pandas()
        tok = q.QUERIES["token_count"](SF).to_pandas()
        assert set(df["split"]) == {"train", "valid", "test"}
        assert df["n_docs"].sum() == len(splits)
        assert df["n_tokens"].sum() == tok["n_tokens"].sum()
        # integer-floor shares can undershoot by at most one PPM per row
        assert 1_000_000 - 3 <= df["token_share_ppm"].sum() <= 1_000_000


class TestRedirects:
    def test_pointer_doubling_matches_closed_form(self, ray_session):
        """For the i -> i-1 chain fixture the terminal and hop count
        have a closed form (final = i - i % B, hops = i % B) — the
        doubling rounds must land exactly there."""
        df = q.QUERIES["redirects"](SF).to_pandas()
        ids = df["url"].str.extract(r"p(\d+)$")[0].astype("int64")
        finals = df["final_url"].str.extract(r"p(\d+)$")[0].astype("int64")
        assert (finals == ids - ids % q.REDIR_BLOCK).all()
        assert (df["hops"] == ids % q.REDIR_BLOCK).all()
        assert len(df) == 500
        # every terminal is a fixpoint
        term = df[ids % q.REDIR_BLOCK == 0]
        assert (term["url"] == term["final_url"]).all()
        assert (term["hops"] == 0).all()
