"""Unit tests for the session-6 webtext operators: WARC record parsing
(Content-Length framing, noise-record skipping), Bloom-filter incremental
dedup semantics (no false negatives, reported false positives), CCNet
perplexity tertiles (per-lang cutoffs, bucket monotonicity) and BPE pair
statistics (end-of-word marker, unicode symbols). The oracle gate pins
the end-to-end values; these pin the behavioral edges."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from adaptive_pdf_extractor_ray.pipelines import queries as q
from adaptive_pdf_extractor_ray.sources import warc as w

SF = "/root/testdata/sf0.001"


class TestWarcParser:
    def _mk(self, kind, payload, uri="https://x.example/a",
            date="2024-01-01T00:00:00Z"):
        return w._record(
            kind,
            [("WARC-Target-URI", uri), ("WARC-Date", date)],
            payload,
        )

    def test_content_length_framing_beats_separator_scan(self):
        # body embeds the record separator; a scan-based parser would
        # truncate the body and misalign every later record
        body = b"before\r\n\r\nafter"
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        data = self._mk("response", http) + self._mk(
            "response",
            b"HTTP/1.1 404 Not Found\r\n\r\nmissing",
            uri="https://x.example/b",
        )
        recs = w.parse_warc_records(data)
        assert [r["url"] for r in recs] == [
            "https://x.example/a", "https://x.example/b",
        ]
        assert recs[0]["text"] == "before\r\n\r\nafter"
        assert recs[0]["n_bytes"] == len(body)
        assert recs[1]["status"] == 404

    def test_non_response_records_skipped(self):
        data = (
            self._mk("warcinfo", b"software: test\r\n")
            + self._mk("request", b"GET / HTTP/1.1\r\n\r\n")
            + self._mk(
                "response", b"HTTP/1.1 200 OK\r\n\r\nhello"
            )
        )
        recs = w.parse_warc_records(data)
        assert len(recs) == 1 and recs[0]["text"] == "hello"

    def test_truncated_tail_stops_cleanly(self):
        good = self._mk("response", b"HTTP/1.1 200 OK\r\n\r\nok")
        recs = w.parse_warc_records(good + b"WARC/1.0\r\nWARC-Type: resp")
        assert len(recs) == 1  # parsed prefix kept, garbage dropped

    def test_fixture_roundtrip_counts(self, ray_session):
        df = q.QUERIES["warc_roundtrip"](SF).to_pandas()
        assert len(df) == 240
        assert set(df["status"].unique()) == {200, 404}
        # the CRLFCRLF-trap bodies parsed to full length (title intact)
        assert (df["title"].str.startswith("Page ")).all()
        assert df["url"].is_unique


class TestBloomDedup:
    def test_no_false_negatives_and_flags(self, ray_session):
        df = q.QUERIES["bloom_dedup"](SF).to_pandas()
        # Bloom's contract: every true member tests positive
        assert df[df["is_prior"]]["maybe_dup"].all()
        # false positives are exactly maybe_dup among non-members
        fp = df[~df["is_prior"]]["maybe_dup"]
        assert (df["false_pos"] == (df["maybe_dup"] & ~df["is_prior"])).all()
        # at m=2^17, k=4, n~333 the FP probability is ~1e-10 — none here
        assert int(fp.sum()) == 0

    def test_position_arithmetic_is_stable(self):
        assert q._bloom_pos("abc", 0) == q._bloom_pos("abc", 0)
        assert q._bloom_pos("abc", 0) != q._bloom_pos("abc", 1)
        assert 0 <= q._bloom_pos("abc", 3) < q.BLOOM_BITS


class TestCcnetBuckets:
    def test_tertiles_per_lang(self, ray_session):
        df = q.QUERIES["ccnet_buckets"](SF).to_pandas()
        assert set(df["bucket"].unique()) <= {"head", "middle", "tail"}
        for lang, g in df.groupby("lang"):
            n = len(g)
            counts = g["bucket"].value_counts()
            # quantized cutoffs make splits approximate; head must hold
            # at least a third (cutoff is the FIRST centibit bucket whose
            # cumulative count reaches ceil(n/3)) and buckets must be
            # monotone in lm_bits
            assert counts.get("head", 0) >= n // 3
            h = g[g["bucket"] == "head"]["lm_bits"].max()
            m = g[g["bucket"] == "middle"]["lm_bits"]
            t = g[g["bucket"] == "tail"]["lm_bits"]
            if len(m):
                assert m.min() > h - 0.01  # centibit quantization slack
            if len(m) and len(t):
                assert t.min() > m.max() - 0.01

    def test_single_lang_corpus(self, ray_session, tmp_path):
        rows = [(i, f"w{i % 4} common text", "en") for i in range(30)]
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
        df = q.QUERIES["ccnet_buckets"](str(tmp_path)).to_pandas()
        assert len(df) == 30
        # 4 distinct texts -> few distinct bits values; assignment total
        assert (df["bucket"] == "head").sum() >= 10


class TestBpePairs:
    def test_end_of_word_marker_and_counts(self, ray_session, tmp_path):
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["ab ab a", "b"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
            }
        )
        pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
        df = q.QUERIES["bpe_pairs"](str(tmp_path)).to_pandas()
        got = dict(zip(df["pair"], df["n"]))
        # "ab" x2 -> pairs: ab, b</w> each twice; "a" -> a</w>; "b" -> b</w>
        assert got["ab"] == 2
        assert got["b</w>"] == 3
        assert got["a</w>"] == 1

    def test_unicode_symbols(self, ray_session, tmp_path):
        t = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["naïve"], pa.string()),
                "lang": pa.array(["fr"], pa.string()),
            }
        )
        pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
        df = q.QUERIES["bpe_pairs"](str(tmp_path)).to_pandas()
        pairs = set(df["pair"])
        assert "aï" in pairs and "ïv" in pairs and "e</w>" in pairs

    def test_rank_ties_break_by_pair(self, ray_session):
        df = q.QUERIES["bpe_pairs"](SF).to_pandas()
        assert len(df) == q.BPE_TOPK
        rows = list(zip(df["n"], df["pair"]))
        assert rows == sorted(rows, key=lambda r: (-r[0], r[1]))


class TestCdxIndex:
    def test_offsets_enable_random_access(self, ray_session):
        """The CDX contract: seeking to rec_offset and reading rec_length
        bytes must yield exactly one parseable record with the indexed
        url — a wrong offset breaks every downstream fetch."""
        import hashlib

        warc_dir, _ = q.warc_corpus()
        df = q.QUERIES["cdx_index"](SF).to_pandas()
        assert len(df) == 240
        sample = df.sort_values("url").iloc[::37]  # every 37th record
        for _, r in sample.iterrows():
            with open(os.path.join(warc_dir, r["warc_file"]), "rb") as f:
                f.seek(r["rec_offset"])
                blob = f.read(r["rec_length"]) + b"\r\n\r\n"
            recs = w.parse_warc_records(blob)
            assert len(recs) == 1
            assert recs[0]["url"] == r["url"]
            got = hashlib.md5(recs[0]["text"].encode()).hexdigest()
            assert got == r["digest"]

    def test_surt_key(self):
        assert w.surt_key("https://www.Example.com/a/b?q=1") == (
            "com,example)/a/b?q=1"
        )
        assert w.surt_key("http://sub.host.org:8080/x") == "org,host,sub)/x"
        assert w.surt_key("https://plain.io") == "io,plain)/"


class TestWarcStreaming:
    def test_stream_core_resumes_across_chunk_boundaries(self):
        """Feed the incremental core byte-by-byte-ish: records must come
        out whole with file-absolute offsets once enough bytes arrive."""
        data = b""
        expected = []
        for j in range(5):
            body = f"HTTP/1.1 200 OK\r\n\r\nbody {j} \r\n\r\n trap".encode()
            rec = w._record(
                "response",
                [("WARC-Target-URI", f"https://s.example/{j}"),
                 ("WARC-Date", "2024-01-01T00:00:00Z")],
                body,
            )
            expected.append((f"https://s.example/{j}", len(data)))
            data += rec
        got = []
        buf, base = b"", 0
        for i in range(0, len(data), 37):  # 37-byte trickle
            buf += data[i:i + 37]
            recs, consumed = w.parse_warc_stream(buf, base)
            buf = buf[consumed:]
            base += consumed
            got.extend((r["url"], r["offset"]) for r in recs)
        assert got == expected

    def test_datasource_matches_whole_file_parse(self, ray_session):
        import ray.data as rd

        warc_dir, _ = q.warc_corpus()
        streamed = (
            rd.read_datasource(
                w.WarcDatasource(
                    warc_dir, records_per_block=7, chunk_bytes=256
                )
            )
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        whole = []
        for fn in sorted(os.listdir(warc_dir)):
            with open(os.path.join(warc_dir, fn), "rb") as f:
                for r in w.parse_warc_records(f.read()):
                    whole.append(
                        {
                            "url": r["url"], "warc_date": r["warc_date"],
                            "status": r["status"], "n_bytes": r["n_bytes"],
                            "text": r["text"], "warc_file": fn,
                            "rec_offset": r["offset"],
                            "rec_length": r["length"],
                        }
                    )
        import pandas as pd

        wdf = pd.DataFrame(whole).sort_values("url").reset_index(drop=True)
        assert streamed.equals(wdf[streamed.columns])
        assert len(streamed) == 240
