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
