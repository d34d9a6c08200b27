"""Minimal PDF build + layout-aware text extraction.

Mirrors the role of ``get_pdf_text`` (``/root/reference/src/data.py:201-223``:
single-page PDF -> text, asserting exactly one page) without PyPDF2, which
is not available here. The parser is a from-scratch content-stream reader:

- locate ``stream ... endstream`` objects, inflate ``/FlateDecode`` ones;
- tokenize text operators: ``Tm`` / ``Td`` / ``TD`` set the text cursor,
  ``Tj`` / ``'`` / ``TJ`` show strings;
- perform the XY-cut line reconstruction the north star asks for: glyph
  runs are bucketed into lines by their y coordinate (descending — PDF
  user space grows upward), sorted by x within a line, joined left to
  right; lines joined with ``\\n``.

:func:`build_pdf` emits a deterministic uncompressed (or Flate) one-page
PDF whose content round-trips: ``parse_pdf_text(build_pdf(t)) == t``.
"""

from __future__ import annotations

import re
import zlib

PDF_MAGIC = b"%PDF-"


class PdfError(ValueError):
    pass


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


_UNESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
              "(": "(", ")": ")", "\\": "\\"}


def _unescape_pdf_string(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _UNESCAPES:
                out.append(_UNESCAPES[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < len(s) and j - i <= 3 and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1 : j], 8)))
                i = j
                continue
        out.append(c)
        i += 1
    return "".join(out)


def build_pdf(text: str, compress: bool = False) -> bytes:
    """Build a deterministic single-page PDF rendering ``text``.

    Each input line becomes one ``Tm``-positioned ``Tj`` run at descending
    y. Latin-1 text only (covers the pt_BR corpus alphabet).
    """
    lines = text.split("\n")
    runs = []
    y = 760
    for ln in lines:
        runs.append((72.0, float(y), ln))
        y -= 14
    return build_pdf_from_runs(runs, compress=compress)


def build_pdf_from_runs(
    runs: list[tuple[float, float, str]], compress: bool = False
) -> bytes:
    """Build a single-page PDF from explicit ``(x, y, text)`` runs — the
    fixture builder for detached-header / grid layouts (labels and
    values on different lines, x-aligned by column)."""
    ops = ["BT", "/F1 12 Tf"]
    for x, y, txt in runs:
        ops.append(f"1 0 0 1 {x:g} {y:g} Tm ({_escape_pdf_string(txt)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    )
    objs.append(
        b"<< /Length %d%s >>\nstream\n" % (len(content), filt)
        + content
        + b"\nendstream"
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)


_STREAM_START_RX = re.compile(rb"(?<!end)stream\r?\n")
_LENGTH_RX = re.compile(rb"/Length\s+(\d+)\b(?!\s+0\s+R)")
_ENDSTREAM_RX = re.compile(rb"\r?\nendstream")
_PAGE_RX = re.compile(rb"/Type\s*/Page\b(?!s)")
# string-or-operator tokens inside a content stream
_TOK_RX = re.compile(
    r"\((?P<str>(?:\\.|[^\\()])*)\)\s*(?P<sop>Tj|')"      # (..) Tj
    r"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"                   # [..] TJ
    r"|(?P<a>-?[\d.]+)\s+(?P<b>-?[\d.]+)\s+(?P<c>-?[\d.]+)\s+(?P<d>-?[\d.]+)\s+"
    r"(?P<e>-?[\d.]+)\s+(?P<f>-?[\d.]+)\s+Tm"
    r"|(?P<tx>-?[\d.]+)\s+(?P<ty>-?[\d.]+)\s+(?P<dop>Td|TD)",
    re.DOTALL,
)
_ARR_STR_RX = re.compile(r"\((?:\\.|[^\\()])*\)", re.DOTALL)

Y_LINE_TOLERANCE = 2.0


def parse_pdf_runs(data: bytes | memoryview) -> list[tuple[float, float, str]]:
    """Positional text runs ``(y, x, text)`` of a single-page PDF —
    the layout-grid extractor's input (`functions/layout.py`), sharing
    the same stream walk as :func:`parse_pdf_text`.

    Raises :class:`PdfError` for non-PDF bytes or page count != 1."""
    raw = bytes(data)
    if not raw.startswith(PDF_MAGIC):
        raise PdfError("not a PDF (missing %PDF- magic)")
    n_pages = len(_PAGE_RX.findall(raw))
    if n_pages == 0:
        raise PdfError("PDF has no pages")
    if n_pages > 1:
        raise PdfError(f"PDF has {n_pages} pages, expected 1")

    runs: list[tuple[float, float, str]] = []  # (y, x, text)
    for m in _STREAM_START_RX.finditer(raw):
        # the stream's dict starts at the owning "N 0 obj" keyword
        hdr_at = raw.rfind(b"obj", 0, m.start())
        hdr = raw[max(hdr_at, 0) : m.start()]
        if b"/Image" in hdr or b"/DCTDecode" in hdr or b"/JPXDecode" in hdr:
            continue  # image XObjects: megabytes of pixels, no text ops
        lm = _LENGTH_RX.search(hdr)
        if lm is not None:  # exact byte length (robust to \r-final payloads)
            body = raw[m.end() : m.end() + int(lm.group(1))]
        else:  # fall back to scanning for the endstream keyword
            em = _ENDSTREAM_RX.search(raw, m.end())
            body = raw[m.end() : em.start() if em else len(raw)]
        if b"/FlateDecode" in hdr:
            try:
                body = zlib.decompress(body)
            except zlib.error as e:
                raise PdfError(f"bad Flate stream: {e}") from e
        if b"BT" not in body:
            continue  # no text objects: skip tokenizing binary payloads
        try:
            s = body.decode("latin-1")
        except Exception as e:  # pragma: no cover - latin-1 never fails
            raise PdfError(str(e)) from e
        x = y = 0.0
        for t in _TOK_RX.finditer(s):
            if t.group("sop"):
                runs.append((y, x, _unescape_pdf_string(t.group("str"))))
            elif t.group("arr") is not None:
                parts = [
                    _unescape_pdf_string(sm.group(0)[1:-1])
                    for sm in _ARR_STR_RX.finditer(t.group("arr"))
                ]
                runs.append((y, x, "".join(parts)))
            elif t.group("dop"):
                x += float(t.group("tx"))
                y += float(t.group("ty"))
            else:
                x, y = float(t.group("e")), float(t.group("f"))

    runs.sort(key=lambda r: (-r[0], r[1]))
    return runs


def parse_pdf_text(data: bytes | memoryview) -> str:
    """Extract text from a single-page PDF via XY-cut line reconstruction.

    Raises :class:`PdfError` for non-PDF bytes or page count != 1 — the
    caller maps that to the row's ``error`` column (row-level fault
    isolation, vs the reference's hard assert at ``src/data.py:219-221``).
    """
    runs = parse_pdf_runs(data)
    if not runs:
        return ""
    # XY-cut: bucket into lines by y (descending), sort by x inside a line
    lines: list[list[tuple[float, str]]] = []
    last_y: float | None = None
    for y, x, txt in runs:
        if last_y is None or abs(y - last_y) > Y_LINE_TOLERANCE:
            lines.append([])
            last_y = y
        lines[-1].append((x, txt))
    return "\n".join("".join(t for _, t in line) for line in lines)
