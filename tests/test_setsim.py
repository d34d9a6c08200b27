"""Exact set-similarity join (AllPairs/PPJoin prefix filter): the lemma
itself property-tested in pure Python, plus an e2e equality check of the
distributed pipeline against brute-force all-pairs on a corpus built to
stress the filter (near-dups at / around the threshold, shared
boilerplate, short docs). Oracle value-parity runs in the driver gate.
"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from adaptive_pdf_extractor_ray.pipelines import queries as q
from adaptive_pdf_extractor_ray.stages import setsim as ss
from adaptive_pdf_extractor_ray.stages.dedup import _shingles

SF = "/root/testdata/sf0.001"


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class TestPrefixLength:
    def test_bounds(self):
        for n in range(1, 200):
            for tau in (0.1, 0.5, 0.6, 0.9, 1.0):
                p = ss.prefix_length(n, tau)
                assert 1 <= p <= n
        assert ss.prefix_length(10, 1.0) == 1

    @given(
        sets=st.lists(
            st.frozensets(st.integers(0, 30), min_size=1, max_size=15),
            min_size=2,
            max_size=12,
        ),
        tau=st.sampled_from([0.3, 0.5, 0.6, 0.8]),
    )
    @settings(max_examples=200, deadline=None)
    def test_lemma_no_false_negatives(self, sets, tau):
        """Any pair with J >= tau must share a token within both prefixes
        under the (df, token) global order — the completeness guarantee
        the distributed pipeline relies on."""
        df: dict[int, int] = {}
        for s in sets:
            for t in s:
                df[t] = df.get(t, 0) + 1
        order = lambda t: (df[t], t)  # noqa: E731
        prefixes = [
            set(sorted(s, key=order)[: ss.prefix_length(len(s), tau)])
            for s in sets
        ]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                if _jaccard(set(sets[i]), set(sets[j])) >= tau:
                    assert prefixes[i] & prefixes[j], (
                        sets[i], sets[j], prefixes[i], prefixes[j])


class TestExplode:
    def test_distinct_within_doc(self):
        t = pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array(["a b c a b c a b c"], pa.string()),
        })
        out = ss.explode_shingle_sets(t)
        shs = out["sh"].to_pylist()
        assert len(shs) == len(set(shs))
        assert set(shs) == set(_shingles("a b c a b c a b c"))

    def test_short_and_empty_docs(self):
        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["one two", ""], pa.string()),
        })
        out = ss.explode_shingle_sets(t)
        # <3 tokens -> the single joined shingle; empty -> no rows
        assert out["doc_id"].to_pylist() == [1]
        assert out["sh"].to_pylist() == ["one two"]


class TestEndToEnd:
    def _write_corpus(self, tmp_path) -> str:
        """Near-dups straddling tau=0.6 plus heavy shared boilerplate
        (stress: boilerplate shingles have huge df and must stay out of
        prefixes)."""
        boiler = " ".join(f"nav{i % 4} menu{i % 3}" for i in range(6))
        texts, ids = [], []
        for i in range(40):
            body = " ".join(f"w{(i * 17 + k) % 400}" for k in range(30))
            texts.append(body + " " + boiler)
            ids.append(i)
        # planted near-identical pairs (one word swapped)
        for i in range(40, 50):
            base = " ".join(f"p{i}x{k}" for k in range(30))
            texts.append(base)
            ids.append(i)
            texts.append(base.replace(f"p{i}x7", "QQQ"))
            ids.append(i + 100)
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(tbl, tmp_path / "documents.parquet")
        return str(tmp_path)

    def test_matches_bruteforce(self, ray_session, tmp_path):
        sf = self._write_corpus(tmp_path)
        got = q.QUERIES["setsim_join"](sf).to_pandas()
        got_pairs = {
            (a, b): round(j, 6)
            for a, b, j in zip(got["a"], got["b"], got["jaccard"])
        }
        tbl = pq.read_table(tmp_path / "documents.parquet")
        sets = {
            d: set(_shingles(t))
            for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
        }
        want = {}
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                j = _jaccard(sets[ids[x]], sets[ids[y]])
                if round(j, 6) >= ss.SETSIM_TAU:
                    want[(ids[x], ids[y])] = round(j, 6)
        assert got_pairs == want
        assert want, "fixture must actually plant qualifying pairs"

    def test_sf_fixture_pairs(self, ray_session):
        df = q.QUERIES["setsim_join"](SF).to_pandas()
        assert (df["jaccard"] >= ss.SETSIM_TAU).all()
        assert (df["a"] < df["b"]).all()
        # no duplicate pairs survive the distinct stage
        assert not df.duplicated(subset=["a", "b"]).any()


class TestSkewGuard:
    def test_identical_copy_cluster_over_cap(self, ray_session, tmp_path):
        """An over-cap bucket of byte-identical docs must star-collapse
        (O(n) pairs at J=1.0, every member linked to the representative)
        instead of emitting C(n,2) pairs from one task."""
        n_ident = 1500  # > SETSIM_MAX_BUCKET
        base = " ".join(f"dup{k}" for k in range(40))
        ids = list(range(n_ident))
        texts = [base] * n_ident
        # plus one ordinary near-dup pair that must still surface
        ids += [9000, 9001]
        pair_base = " ".join(f"z{k}" for k in range(30))
        texts += [pair_base, pair_base.replace("z7", "Q")]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            tmp_path / "documents.parquet",
        )
        got = q.QUERIES["setsim_join"](str(tmp_path)).to_pandas()
        ident = got[(got["a"] < n_ident) & (got["b"] < n_ident)]
        # star, not quadratic: exactly n-1 pairs, all J = 1.0, all
        # anchored at the min-doc_id representative
        assert len(ident) == n_ident - 1
        assert (ident["jaccard"] == 1.0).all()
        assert (ident["a"] == 0).all()
        assert set(ident["b"]) == set(range(1, n_ident))
        # the ordinary pair still verifies exactly
        other = got[(got["a"] == 9000) & (got["b"] == 9001)]
        assert len(other) == 1


class TestRouteEquivalence:
    def test_broadcast_matches_join_route(self, ray_session, monkeypatch):
        """Forcing the df table over the broadcast cap must route to the
        distributed join + groupby(doc_id) prefix path and produce the
        identical pair set — the repo's size-routed equivalence
        contract."""
        import pandas as pd

        a = (q.QUERIES["setsim_join"](SF).to_pandas()
             .sort_values(["a", "b"]).reset_index(drop=True))
        monkeypatch.setattr(q.qdedup, "SETSIM_BROADCAST_CAP", 1)
        b = (q.QUERIES["setsim_join"](SF).to_pandas()
             .sort_values(["a", "b"]).reset_index(drop=True))
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)
