"""Session-19 (round 4) operators: PII scan / redact / gate over the
injected deterministic fixture. Ground truth is re-derived here with
Python `re` (a third regex engine vs Arrow-RE2 and DuckDB-RE2), and the
fixture's residue-class construction is asserted directly."""

import re

import pyarrow.parquet as pq

from adaptive_pdf_extractor_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"  # unused by the fixture ops; API surface


class TestPiiScan:
    def test_counts_match_python_re(self, ray_session):
        got = (
            q.q_pii_scan(SF)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        docs = pq.read_table(q.pii_corpus()).to_pandas()
        pats = {
            "n_email": re.compile(q.PII_EMAIL_RE),
            "n_phone": re.compile(q.PII_PHONE_RE),
            "n_ipv4": re.compile(q.PII_IPV4_RE),
            "n_ssn": re.compile(q.PII_SSN_RE),
        }
        for _, row in docs.iterrows():
            g = got.loc[row["doc_id"]]
            tot = 0
            for col, pat in pats.items():
                want = len(pat.findall(row["text"]))
                assert g[col] == want, (row["doc_id"], col)
                tot += want
            assert g["n_pii"] == tot

    def test_residue_class_construction(self, ray_session):
        got = q.q_pii_scan(SF).to_pandas().set_index("doc_id")
        for i in range(400):
            g = got.loc[i]
            # email per %3, second email per %13
            assert g["n_email"] == (i % 3 == 0) + (i % 13 == 0)
            assert g["n_phone"] == (i % 5 == 0)
            assert g["n_ipv4"] == (i % 7 == 0)
            assert g["n_ssn"] == (i % 11 == 0)

    def test_clean_docs_exist(self, ray_session):
        got = q.q_pii_scan(SF).to_pandas()
        assert (got["n_pii"] == 0).sum() > 100  # a real clean cohort


class TestPiiScrub:
    def test_no_pii_survives_redaction(self, ray_session):
        got = q.q_pii_scrub(SF).to_pandas()
        for pat in (q.PII_EMAIL_RE, q.PII_PHONE_RE,
                    q.PII_IPV4_RE, q.PII_SSN_RE):
            assert not got["text_redacted"].str.contains(
                pat, regex=True
            ).any()

    def test_placeholders_inserted(self, ray_session):
        got = q.q_pii_scrub(SF).to_pandas().set_index("doc_id")
        assert "[EMAIL]" in got.loc[0, "text_redacted"]  # 0%3==0
        assert "[PHONE]" in got.loc[5, "text_redacted"]
        assert "[IP]" in got.loc[7, "text_redacted"]
        assert "[SSN]" in got.loc[11, "text_redacted"]
        # clean doc untouched
        docs = pq.read_table(q.pii_corpus()).to_pandas() \
            .set_index("doc_id")
        clean = next(
            i for i in range(400)
            if all(i % m for m in (3, 5, 7, 11, 13))
        )
        assert got.loc[clean, "text_redacted"] == docs.loc[clean, "text"]


class TestPiiGate:
    def test_gate_equals_zero_count_set(self, ray_session):
        scan = q.q_pii_scan(SF).to_pandas()
        want = set(scan.loc[scan["n_pii"] == 0, "doc_id"])
        got = set(q.q_pii_gate(SF).to_pandas()["doc_id"])
        assert got == want


class TestBitextMine:
    def test_matches_numpy_replay(self, ray_session):
        import numpy as np

        got = (
            q.q_bitext_mine(SF)
            .to_pandas()
            .sort_values("src_id")
            .reset_index(drop=True)
        )
        t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
        lab = t["label"].to_numpy() % 2
        ids = t["vec_id"].to_numpy()
        M = np.asarray(t["embedding"].tolist(), dtype=np.float64)
        M = M / np.maximum(
            np.linalg.norm(M, axis=1, keepdims=True), 1e-12
        )
        A_ids, A = ids[lab == 0], M[lab == 0]
        B_ids, B = ids[lab == 1], M[lab == 1]
        k = q.BITEXT_K
        s4 = np.rint(np.round(A @ B.T, 4) * 10000).astype(np.int64)
        # order columns by id so stable sorts tie-break on id asc
        bo = np.argsort(B_ids)
        ao = np.argsort(A_ids)
        sAB = s4[:, bo][np.argsort(A_ids, kind="stable")]
        # per-y denominator: top-k of column y over A
        sBA = s4[ao][:, bo]
        mysum = {}
        for yi, y in enumerate(B_ids[bo]):
            col = np.sort(sBA[:, yi], kind="stable")[::-1][:k]
            mysum[int(y)] = int(col.sum())
        want = {}
        for xi, x in enumerate(np.sort(A_ids)):
            row = sAB[xi]
            top = np.argsort(-row, kind="stable")[:k]
            mxsum = int(row[top].sum())
            best = None
            for j in top:
                num = int(row[j])
                den = mxsum + mysum[int(B_ids[bo][j])]
                if best is None or num * best[1] > best[0] * den or (
                    num * best[1] == best[0] * den
                    and int(B_ids[bo][j]) < best[2]
                ):
                    best = (num, den, int(B_ids[bo][j]))
            if 2 * k * best[0] > best[1]:
                want[int(x)] = best
        assert len(got) == len(want)
        for _, r in got.iterrows():
            num, den, y = want[r["src_id"]]
            assert (r["dst_id"], r["sim_e4"], r["den_e4"]) == (
                y, num, den
            )

    def test_margin_filter_excludes_some(self, ray_session):
        got = q.q_bitext_mine(SF).to_pandas()
        t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
        n_a = int(((t["label"] % 2) == 0).sum())
        assert 0 < len(got) < n_a  # filter is active, not degenerate
        # every kept pair really clears margin > 1
        assert (2 * q.BITEXT_K * got["sim_e4"] > got["den_e4"]).all()


class TestLeakageFreeSplit:
    def test_dropped_iff_nontest_neardup_of_test(self, ray_session):
        got = (
            q.q_leakage_free_split(SF)
            .to_pandas()
            .set_index("doc_id")["split"]
        )
        base = (
            q.q_split_assign(SF).to_pandas().set_index("doc_id")["split"]
        )
        pairs = q.q_setsim_join(SF).to_pandas()[["a", "b"]]
        test_ids = set(base[base == "test"].index)
        flagged = set()
        for a, b in pairs.itertuples(index=False):
            if b in test_ids:
                flagged.add(a)
            if a in test_ids:
                flagged.add(b)
        assert len(got) == len(base)  # every doc still labeled
        for doc, orig in base.items():
            if orig != "test" and doc in flagged:
                assert got[doc] == "dropped", doc
            else:
                assert got[doc] == orig, doc

    def test_test_side_never_dropped(self, ray_session):
        got = q.q_leakage_free_split(SF).to_pandas()
        base = q.q_split_assign(SF).to_pandas().set_index("doc_id")
        test_ids = base[base["split"] == "test"].index
        sub = got.set_index("doc_id").loc[test_ids, "split"]
        assert (sub == "test").all()


class TestSnapshotAsof:
    def test_asof_semantics_vs_python_replay(self, ray_session):
        import pandas as pd

        got = q.q_snapshot_asof(SF).to_pandas().set_index("url")
        allc = pq.read_table(q.recrawl_corpus()).to_pandas()
        cutoff = pd.Timestamp(q.SNAPSHOT_ASOF_TS)
        want = (
            allc[allc["warc_ts"] <= cutoff]
            .sort_values("warc_ts")
            .groupby("url")
            .tail(1)
            .set_index("url")
        )
        assert set(got.index) == set(want.index)
        for u in want.index:
            assert got.loc[u, "warc_ts"] == want.loc[u, "warc_ts"]
            assert got.loc[u, "text"] == want.loc[u, "text"]

    def test_later_first_capture_excluded(self, ray_session):
        # every url in the fixture has revision 0 at EPOCH + seconds,
        # before the cutoff — so all 150 urls appear, each at rev <= 1
        got = q.q_snapshot_asof(SF).to_pandas()
        assert len(got) == 150
        assert (got["text"].str.startswith(("revision 0", "revision 1"))).all()


class TestCrawlSchedule:
    def test_per_host_offsets_are_politeness_spaced(self, ray_session):
        got = q.q_crawl_schedule(SF).to_pandas()
        for host, g in got.groupby("host"):
            g = g.sort_values("fetch_rank")
            assert list(g["fetch_rank"]) == list(range(1, len(g) + 1))
            assert list(g["fetch_offset_s"]) == [
                (r - 1) * q.CRAWL_DELAY_S for r in g["fetch_rank"]
            ]

    def test_longer_pages_fetched_first(self, ray_session):
        got = q.q_crawl_schedule(SF).to_pandas()
        pages = pq.read_table(q.link_corpus()).to_pandas()
        n = pages.set_index("url")["text"].str.len().fillna(-1)
        for _, g in got.groupby("host"):
            g = g.sort_values("fetch_rank")
            lens = [int(n[u]) for u in g["url"]]
            assert lens == sorted(lens, reverse=True)


class TestQualityComposite:
    def test_score_is_sum_of_rule_bits(self, ray_session):
        got = q.q_quality_composite(SF).to_pandas()
        bits = got[["r_len", "r_stop", "r_punct", "r_toklen",
                    "r_chars"]].sum(axis=1)
        assert (got["score"] == bits).all()
        assert (got["keep"] == (got["score"] >= 4).astype(int)).all()

    def test_rules_discriminate(self, ray_session):
        got = q.q_quality_composite(SF).to_pandas()
        assert got["keep"].sum() > 0
        assert 0 < got["score"].min() <= got["score"].max() == 5


class TestBuildPostings:
    def test_postings_match_python_replay(self, ray_session):
        got = q.q_build_postings(SF).to_pandas().set_index("term")
        docs = pq.read_table(
            SF + "/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        inv: dict = {}
        for did, s in zip(docs["doc_id"], docs["text"]):
            for w in set((s or "").split(" ")) - {""}:
                inv.setdefault(w, []).append(did)
        assert set(got.index) == set(inv)
        for term, ids in inv.items():
            assert got.loc[term, "df"] == len(ids)
            want = (
                ",".join(str(i) for i in sorted(ids))
                if len(ids) <= q.POSTINGS_CAP else ""
            )
            assert got.loc[term, "postings"] == want

    def test_cap_guards_stopword_class(self, ray_session):
        got = q.q_build_postings(SF).to_pandas()
        over = got[got["df"] > q.POSTINGS_CAP]
        assert len(over) > 0  # the corpus has a stopword class
        assert (over["postings"] == "").all()
        under = got[got["df"] <= q.POSTINGS_CAP]
        assert (under["postings"].str.len() > 0).all()


class TestLinkDensity:
    def test_matches_python_replay(self, ray_session):
        import re as _re

        got = q.q_link_density(SF).to_pandas().set_index("url")
        pages = pq.read_table(
            q.link_corpus(), columns=["url", "html"]
        ).to_pandas()
        p_re = _re.compile(r"<p>([^<]*)</p>")
        a_re = _re.compile(r'<a href="[^"]*">([^<]*)</a>')
        for u, h in zip(pages["url"], pages["html"]):
            s = h.decode()
            c = sum(len(m) for m in p_re.findall(s))
            a = sum(len(m) for m in a_re.findall(s))
            g = got.loc[u]
            assert g["content_chars"] == c
            assert g["anchor_chars"] == a
            want = (a * 1_000_000) // (c + a) if c + a else 0
            assert g["link_density_ppm"] == want
            assert g["is_boilerplate"] == int(
                want >= q.LINKDENS_BOILER_PPM
            )

    def test_flags_split_is_nontrivial(self, ray_session):
        got = q.q_link_density(SF).to_pandas()
        assert 0 < got["is_boilerplate"].sum() < len(got)
