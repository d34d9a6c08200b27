"""Text normalization — byte-identical to the reference semantics.

Reference: ``/root/reference/src/data.py:51-95`` (``normalize_text``).
The six steps, in order:

1. space between letter and digit   ``([a-zA-Z])(\\d)   -> \\1 \\2``
2. space between digit and letter   ``(\\d)([a-zA-Z])   -> \\1 \\2``
3. space in camel-case boundary     ``([a-z])([A-Z])    -> \\1 \\2``
4. space before Upper+lower run     ``([A-Z])([A-Z][a-z]) -> \\1 \\2``
5. collapse ``[ \\t]+`` -> " ",  ``\\n+`` -> "\\n"
6. ``" ".join(text.split())`` then ``strip()``  (single-line output)

Two implementations with identical output on ASCII-whitespace text:

- :func:`normalize_text` — scalar Python ``re`` (the oracle / truth).
- :func:`normalize_text_array` — vectorized pyarrow RE2 kernels for the
  hot path (``pc.replace_substring_regex`` + ``utf8_trim_whitespace``).

The final whitespace collapse matches Python ``str.split()``'s *unicode*
whitespace set exactly: the vectorized path collapses the explicit RE2
class ``_UNICODE_WS`` (every codepoint where ``str.isspace()`` is true —
U+00A0, U+2000-200A, U+3000, ... — enumerated, not ``\\s``), so the two
implementations are byte-identical on arbitrary unicode input (property-
tested). ``normalize_sql`` uses the same class for the DuckDB oracle.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) pairs, applied in exactly this order.
_STEPS: list[tuple[str, str]] = [
    (r"([a-zA-Z])(\d)", r"\1 \2"),
    (r"(\d)([a-zA-Z])", r"\1 \2"),
    (r"([a-z])([A-Z])", r"\1 \2"),
    (r"([A-Z])([A-Z][a-z])", r"\1 \2"),
    (r"[ \t]+", " "),
    (r"\n+", "\n"),
]

_COMPILED = [(re.compile(p), r) for p, r in _STEPS]

# Every codepoint Python's str.isspace() accepts (the str.split() /
# str.strip() whitespace set), as an RE2 character class. Enumerated so
# the vectorized and SQL paths collapse EXACTLY what the scalar oracle
# collapses — RE2's \s is ASCII-only and would diverge on U+00A0 etc.
_UNICODE_WS = (
    "\\x{0009}-\\x{000D}\\x{001C}-\\x{001F}\\x{0020}\\x{0085}\\x{00A0}"
    "\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}"
    "\\x{3000}"
)


def normalize_text(text: str | None) -> str | None:
    """Scalar reference-equivalent normalization (the oracle)."""
    if text is None:
        return None
    for pat, repl in _COMPILED:
        text = pat.sub(repl, text)
    text = " ".join(text.split())
    return text.strip()


def normalize_text_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized normalization over a pyarrow string array (RE2 kernels).

    Nulls propagate. Byte-identical to :func:`normalize_text` for
    ASCII-whitespace text (asserted in tests).
    """
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    for pattern, replacement in _STEPS:
        arr = pc.replace_substring_regex(arr, pattern=pattern, replacement=replacement)
    # steps 5/6 final collapse: any (unicode) whitespace run -> single
    # space, then strip — the exact str.split() whitespace set
    arr = pc.replace_substring_regex(
        arr, pattern=f"[{_UNICODE_WS}]+", replacement=" "
    )
    return pc.utf8_trim_whitespace(arr)


# DuckDB-expressible equivalent, used to build oracle SQL strings that the
# driver runs side-by-side with the Ray pipeline.  Chained regexp_replace
# with the global flag mirrors the re.sub/RE2 steps above.
def normalize_sql(col: str) -> str:
    """Return a DuckDB SQL expression computing normalize_text(col)."""
    expr = col
    for pattern, replacement in _STEPS:
        pat = pattern.replace("'", "''")
        rep = replacement.replace("\\", "\\")
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    expr = f"regexp_replace({expr}, '[{_UNICODE_WS}]+', ' ', 'g')"
    return f"trim({expr})"
