"""HTML boilerplate strip + PDF parse round-trip tests."""

import pytest

from adaptive_pdf_extractor_ray.functions.textnorm import normalize_text
from adaptive_pdf_extractor_ray.sources.htmlio import build_page, extract_main_text
from adaptive_pdf_extractor_ray.sources.pdfio import (
    PdfError,
    build_pdf,
    parse_pdf_text,
)

SAMPLES = [
    "Nome\nAna Lima\nInscricao 123456",
    "line with (parens) and \\backslash\\ chars",
    "tabs\there\tand   triple spaces",
    "acentuação: ç ã é Ú ô",
    "",
    "trailing newline\n",
]


class TestHtml:
    @pytest.mark.parametrize("text", SAMPLES)
    def test_roundtrip_normalized(self, text):
        page = build_page(text)
        got = extract_main_text(page)
        assert normalize_text(got) == normalize_text(text)

    def test_boilerplate_dropped(self):
        page = build_page("Real content body here").decode()
        text = extract_main_text(page)
        assert "Real content body here" in text
        for junk in ("Home", "Sponsored", "Terms of Service", "trackingId", "margin"):
            assert junk not in text

    def test_link_farm_block_dropped(self):
        doc = (
            "<html><body><div><a href='/a'>one link</a> <a href='/b'>two link</a>"
            "</div><p>the actual long paragraph of content text</p></body></html>"
        )
        assert extract_main_text(doc) == "the actual long paragraph of content text"

    def test_entities_unescaped(self):
        assert extract_main_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"


class TestPdf:
    @pytest.mark.parametrize("text", SAMPLES)
    @pytest.mark.parametrize("compress", [False, True])
    def test_roundtrip_exact(self, text, compress):
        data = build_pdf(text, compress=compress)
        assert data.startswith(b"%PDF-")
        assert parse_pdf_text(data) == text

    def test_non_pdf_raises(self):
        with pytest.raises(PdfError):
            parse_pdf_text(b"<html>nope</html>")

    def test_multiline_order_preserved(self):
        text = "\n".join(f"line {i}" for i in range(40))
        assert parse_pdf_text(build_pdf(text)) == text


class TestPdfEdgeCases:
    def test_two_page_pdf_rejected(self):
        # mirror the reference's single-page contract (src/data.py:219-221)
        one = build_pdf("page one")
        two = one.replace(
            b"/Kids [3 0 R] /Count 1", b"/Kids [3 0 R 6 0 R] /Count 2"
        ) + b"\n6 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"
        with pytest.raises(PdfError, match="2 pages"):
            parse_pdf_text(two)

    def test_zero_page_pdf_rejected(self):
        with pytest.raises(PdfError, match="no pages"):
            parse_pdf_text(b"%PDF-1.4\nno page objects here")

    def test_truncated_flate_is_error_not_crash(self):
        data = build_pdf("hello flate", compress=True)
        broken = data[: len(data) // 2] + b"\nendstream\nendobj\n%%EOF\n"
        with pytest.raises(PdfError):
            parse_pdf_text(broken)


class TestHtmlEdgeCases:
    def test_unclosed_tags_tolerated(self):
        doc = "<html><body><div><p>content line one<p>content line two"
        out = extract_main_text(doc)
        assert "content line one" in out and "content line two" in out

    def test_empty_and_whitespace_pages(self):
        assert extract_main_text("") == ""
        assert extract_main_text("<html><body>   </body></html>") == ""

    def test_nested_boilerplate_inside_content(self):
        doc = (
            "<article>real text stays"
            "<nav><a href='/x'>menu link</a></nav>"
            " and continues</article>"
        )
        out = extract_main_text(doc)
        assert "real text stays" in out and "continues" in out
        assert "menu link" not in out


class TestCidFonts:
    """Subset/CID-font PDFs: hex show-strings decode through the embedded
    /ToUnicode CMap (bfchar + bfrange), 2-byte Identity-H codes — the
    real-world encoding the round-1 roadmap flagged as future depth."""

    def test_cid_round_trip_unicode(self):
        from adaptive_pdf_extractor_ray.sources.pdfio import (
            build_pdf_cid,
            parse_pdf_text,
        )

        s = "Nome João Ωmega\nInscrição 12345\n日本語 text"
        assert parse_pdf_text(build_pdf_cid(s)) == s
        assert parse_pdf_text(build_pdf_cid(s, compress=True)) == s

    def test_cid_pipeline_ingest(self, ray_session):
        """A CID-font PDF flows through the standard parse stage (kind
        == 'pdf', correct text_norm) with zero code changes upstream."""
        import pyarrow as pa

        from adaptive_pdf_extractor_ray.functions.textnorm import normalize_text
        from adaptive_pdf_extractor_ray.sources.pdfio import build_pdf_cid
        from adaptive_pdf_extractor_ray.stages.parse import (
            normalize_batch,
            parse_batch,
        )

        text = "Nome Maria Ângela\nInscrição 998877"
        batch = pa.table(
            {
                "url": pa.array(["cid://1"], pa.string()),
                "warc_ts": pa.array([None], pa.timestamp("us")),
                "html": pa.array([build_pdf_cid(text)], pa.binary()),
                "text": pa.array([None], pa.string()),
                "lang": pa.array(["pt"], pa.string()),
            }
        )
        out = normalize_batch(parse_batch(batch))
        assert out["kind"][0].as_py() == "pdf"
        assert out["text_norm"][0].as_py() == normalize_text(text)

    def test_hex_without_cmap_falls_back_to_latin1(self):
        """A hex show-string under a font with NO /ToUnicode decodes as
        latin-1 bytes (the PDF default), end to end."""
        import zlib

        from adaptive_pdf_extractor_ray.sources.pdfio import parse_pdf_text

        content = b"BT\n/F1 12 Tf\n1 0 0 1 72 760 Tm <48696768> Tj\nET"
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
            b"<< /Length %d >>\nstream\n" % len(content) + content
            + b"\nendstream",
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ]
        buf = bytearray(b"%PDF-1.4\n")
        for i, body in enumerate(objs, start=1):
            buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
        buf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
        assert parse_pdf_text(bytes(buf)) == "High"
