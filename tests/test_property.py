"""Property-based tests (hypothesis): the invariants the engine leans on.

Each property is the contract a downstream stage assumes; examples are
bounded so the suite stays fast.
"""

import re
import string

from hypothesis import given, settings, strategies as st

# deterministic example generation: this suite is a correctness gate, not
# a fuzzing campaign — a fresh random seed finding a novel corner case
# should happen in a dev run, not flake the driver's verify
settings.register_profile("gate", derandomize=True, deadline=None)
settings.load_profile("gate")

from adaptive_pdf_extractor_ray.functions.rules import Rule
from adaptive_pdf_extractor_ray.functions.textnorm import (
    normalize_text,
    normalize_text_array,
)
from adaptive_pdf_extractor_ray.sources.htmlio import build_page, extract_main_text
from adaptive_pdf_extractor_ray.sources.pdfio import build_pdf, parse_pdf_text

# latin-1-safe printable text without exotic controls
_latin_char = st.characters(
    codec="latin-1", exclude_categories=("Cs", "Cc"),
)
latin_text = st.text(alphabet=_latin_char, max_size=300)
ascii_ws_text = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n.,-()á é", max_size=300
)


class TestNormalizeProperties:
    @settings(max_examples=200, deadline=None)
    @given(ascii_ws_text)
    def test_idempotent(self, s):
        once = normalize_text(s)
        assert normalize_text(once) == once

    @settings(max_examples=200, deadline=None)
    @given(ascii_ws_text)
    def test_single_line_single_spaced(self, s):
        out = normalize_text(s)
        assert "\n" not in out and "\t" not in out and "  " not in out
        assert out == out.strip()

    @settings(max_examples=200, deadline=None)
    @given(st.lists(ascii_ws_text, max_size=8))
    def test_arrow_equals_python(self, texts):
        import pyarrow as pa

        got = normalize_text_array(pa.array(texts, pa.string())).to_pylist()
        assert got == [normalize_text(t) for t in texts]


class TestPdfRoundTrip:
    @settings(max_examples=100, deadline=None)
    @given(latin_text, st.booleans())
    def test_build_parse_roundtrip(self, text, compress):
        # PDF strings can't carry raw \r (EOL-normalized by the format)
        text = text.replace("\r", " ")
        assert parse_pdf_text(build_pdf(text, compress=compress)) == text


class TestHtmlRoundTrip:
    @settings(max_examples=100, deadline=None)
    @given(ascii_ws_text)
    def test_normalized_roundtrip(self, text):
        got = extract_main_text(build_page(text))
        assert normalize_text(got) == normalize_text(text)


class TestRuleEngineRobustness:
    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=40), st.text(max_size=40), ascii_ws_text)
    def test_never_raises_on_arbitrary_patterns(self, pat, vpat, text):
        r = Rule(pattern=pat, validation_regex=vpat)
        v = r.apply(text)  # bad regexes must degrade to None, not raise
        assert v is None or isinstance(v, str)
        assert isinstance(r.validate(v), bool)

    @settings(max_examples=150, deadline=None)
    @given(ascii_ws_text)
    def test_span_offsets_slice_identity(self, text):
        r = Rule(pattern=r"(\w[\w ]*)", validation_regex=r".*")
        v, s, e = r.apply_span(text)
        if v is not None and v != "":
            assert text[s:e] == v

    @settings(max_examples=100, deadline=None)
    @given(st.from_regex(re.compile(r"[A-Za-z0-9 ]{0,30}"), fullmatch=True))
    def test_empty_capture_sentinel(self, tail):
        r = Rule(pattern=r"K()(?=Z|$)", validation_regex=r"^$")
        out = r.apply("KZ" + tail)
        assert out == ""


class TestUnicodeWhitespaceParity:
    """normalize_text_array must equal the scalar oracle on arbitrary
    unicode-whitespace input (VERDICT r1 item 10)."""

    _WS = [chr(c) for c in range(0x11000) if chr(c).isspace()]

    @given(
        st.lists(
            st.one_of(
                st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=6),
                st.sampled_from([chr(c) for c in range(0x11000) if chr(c).isspace()]),
            ),
            max_size=30,
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_array_matches_scalar_on_unicode_ws(self, parts):
        import pyarrow as pa

        from adaptive_pdf_extractor_ray.functions.textnorm import (
            normalize_text,
            normalize_text_array,
        )

        s = "".join(parts)
        got = normalize_text_array(pa.array([s], pa.string()))[0].as_py()
        assert got == normalize_text(s)

    def test_nbsp_and_ideographic_space(self):
        import pyarrow as pa

        from adaptive_pdf_extractor_ray.functions.textnorm import (
            normalize_text,
            normalize_text_array,
        )

        s = "a b　c d   e"
        assert (
            normalize_text_array(pa.array([s]))[0].as_py()
            == normalize_text(s)
            == "a b c d e"
        )

    def test_sql_matches_scalar_on_unicode_ws(self):
        import duckdb

        from adaptive_pdf_extractor_ray.functions.textnorm import (
            normalize_sql,
            normalize_text,
        )

        s = "a b　c   d"
        (got,) = duckdb.connect().execute(
            f"select {normalize_sql('?')}", [s]
        ).fetchone()
        assert got == normalize_text(s)
