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

Divergence note: Python ``str.split()`` splits on *unicode* whitespace
(e.g. U+00A0) while RE2 ``\\s`` is ``[ \\t\\n\\r\\f\\v]``. The corpus this
engine targets is normalized through the same path on both sides, and the
test suite asserts byte-equality of the two implementations over every
fixture corpus; for adversarial unicode input prefer the scalar oracle.
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
    # steps 5/6 final collapse: any whitespace run -> single space, then strip
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
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
    expr = f"regexp_replace({expr}, '\\s+', ' ', 'g')"
    return f"trim({expr})"
