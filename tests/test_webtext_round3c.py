"""Edge/skew unit tests for the late-round-3 webtext kernels (the
oracle gate covers end-to-end values; these pin the per-kernel edge
semantics directly, no Ray session needed)."""

import pyarrow as pa

from adaptive_pdf_extractor_ray.stages import text as tx
from adaptive_pdf_extractor_ray.pipelines import queries as q


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


class TestC4Clean:
    def test_empty_text_dropped(self):
        out = tx.c4_clean_batch(_docs([(1, "")]))
        assert out.num_rows == 0

    def test_js_interstitial_line_dropped_but_doc_survives(self):
        # doc_id 7 % 7 == 0 -> js line injected; content must carry it
        words = " ".join(f"w{i}" for i in range(64))
        out = tx.c4_clean_batch(_docs([(7, words)]))
        assert out.num_rows == 1
        assert "javascript" not in out["text_clean"][0].as_py()
        # js line counted in n_lines but not in n_kept
        assert out["n_lines"][0].as_py() > out["n_kept"][0].as_py()

    def test_lorem_page_dropped_entirely(self):
        words = " ".join(f"w{i}" for i in range(64))
        out = tx.c4_clean_batch(_docs([(31, words)]))
        assert out.num_rows == 0

    def test_curly_brace_page_dropped_entirely(self):
        words = " ".join(f"w{i}" for i in range(64))
        out = tx.c4_clean_batch(_docs([(29, words)]))
        assert out.num_rows == 0

    def test_line_rules(self):
        # doc_id 1: line terminators cycle ('', '!', '?', '.') for
        # line_no 0..3 -> the no-punctuation line 0 must be dropped
        words = " ".join(f"w{i}" for i in range(4 * tx.LINE_TOKENS))
        out = tx.c4_clean_batch(_docs([(1, words)]))
        assert out.num_rows == 1
        assert out["n_lines"][0].as_py() == 4
        assert out["n_kept"][0].as_py() == 3

    def test_short_tail_line_dropped(self):
        # tail window of 2 words < C4_MIN_LINE_WORDS is dropped even
        # when it carries terminal punctuation
        n = 4 * tx.LINE_TOKENS + 2
        words = " ".join(f"w{i}" for i in range(n))
        out = tx.c4_clean_batch(_docs([(4, words)]))
        lines = tx.c4_page_lines(4, words)
        assert len(lines) == 5
        assert out.num_rows == 1
        kept = out["text_clean"][0].as_py().split("\n")
        # the 2-word tail line ends in '.' but fails the word-count rule
        assert all(len(ln.split(" ")) >= tx.C4_MIN_LINE_WORDS for ln in kept)
        assert out["n_kept"][0].as_py() == 3


class TestLineDedupDomain:
    def test_domain_scoped_drop(self):
        drop = {("src_a", __import__("hashlib").md5(
            "home about contact src_a navigation menu".encode()
        ).hexdigest())}
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "source": pa.array(["src_a", "src_b"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "text": pa.array(["alpha beta", "alpha beta"], pa.string()),
            }
        )
        out = tx.LineDedupDomain(drop)(batch)
        # identical header line: dropped for src_a, kept for src_b
        a, b = out["text_clean"].to_pylist()
        assert "home about contact" not in a
        assert "home about contact src_b" in b


class TestPhash:
    def test_within_group_hamming_bounded(self):
        for g in range(20):
            base_doc = g * 5
            ph0 = q._phash(base_doc)
            for d in range(base_doc + 1, base_doc + 5):
                ham = (ph0 ^ q._phash(d)).bit_count()
                assert 1 <= ham <= 4

    def test_band_split_covers_all_bits(self):
        ph = q._phash(123)
        rebuilt = 0
        for k in range(q.PHASH_BANDS):
            rebuilt |= ((ph >> (15 * k)) & 0x7FFF) << (15 * k)
        assert rebuilt == ph


class TestRobotsUrl:
    def test_casino_blocked_everywhere(self):
        # doc_id 19: %19==0 -> /casino/ path; host class 19%13=6 (not %3)
        u = q._filter_url(19)
        assert "/casino/" in u

    def test_page1_prefix_only_on_third_hosts(self):
        rules_site0 = q._robots_rules(0)
        rules_site1 = q._robots_rules(1)
        assert "/page1" in rules_site0 and "/page1" not in rules_site1

    def test_bad_words_fire_on_residues(self):
        assert "xxx" in q._filter_url(23)
        assert "casino" in q._filter_url(19)
        assert "pills" in q._filter_url(29)
        assert all(
            w not in q._filter_url(1) for w in q.BAD_URL_WORDS
        )


class TestCrawlDiffFixture:
    def test_all_four_statuses_present(self):
        import duckdb

        a_dir, b_dir = q.crawl_diff_corpus()
        con = duckdb.connect()
        df = con.execute(
            q.snapshot_diff_oracle_sql(a_dir, b_dir)
        ).df()
        assert set(df["status"]) == {"new", "gone", "changed", "unchanged"}
        # i % 4 fixes the fate -> 50 urls per class at n_urls=200
        assert df["status"].value_counts().to_dict() == {
            "new": 50, "gone": 50, "changed": 50, "unchanged": 50,
        }
