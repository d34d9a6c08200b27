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


def build_pdf_cid(text: str, compress: bool = False) -> bytes:
    """Build a single-page PDF using a SUBSET CID font: every distinct
    character maps to an arbitrary 2-byte CID (assigned by first
    appearance), show-strings are hex (`<...> Tj`), and the only way back
    to text is the embedded /ToUnicode CMap (bfchar + one bfrange) — the
    real-world subset-font encoding `parse_pdf_runs` decodes. Exercises
    full unicode (the CMap dst is UTF-16BE)."""
    chars = sorted(set(text) - {"\n"})
    cid_of = {c: i + 1 for i, c in enumerate(chars)}

    # ToUnicode CMap: first half via bfchar pairs, rest via bfranges of 1
    # (covers both parse paths)
    half = len(chars) // 2
    bfchar = "\n".join(
        f"<{cid_of[c]:04X}> <{ord(c):04X}>" for c in chars[:half]
    )
    bfrange = "\n".join(
        f"<{cid_of[c]:04X}> <{cid_of[c]:04X}> <{ord(c):04X}>"
        for c in chars[half:]
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\n"
        "begincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{max(1, half)} beginbfchar\n{bfchar}\nendbfchar\n"
        f"{max(1, len(chars) - half)} beginbfrange\n{bfrange}\nendbfrange\n"
        "endcmap\nend\n"
    ).encode("latin-1")

    ops = ["BT", "/F1 12 Tf"]
    y = 760
    for ln in text.split("\n"):
        hexs = "".join(f"{cid_of[c]:04X}" for c in ln)
        ops.append(f"1 0 0 1 72 {y} Tm <{hexs}> Tj")
        y -= 14
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
    objs.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Subset+Fake "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
    )
    objs.append(
        b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream"
    )

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
    r"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hop>Tj|')"          # <hex> Tj (CID)
    r"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"                   # [..] TJ
    r"|/(?P<font>[A-Za-z0-9_.+-]+)\s+[\d.]+\s+Tf"          # font select
    r"|(?P<a>-?[\d.]+)\s+(?P<b>-?[\d.]+)\s+(?P<c>-?[\d.]+)\s+(?P<d>-?[\d.]+)\s+"
    r"(?P<e>-?[\d.]+)\s+(?P<f>-?[\d.]+)\s+Tm"
    r"|(?P<tx>-?[\d.]+)\s+(?P<ty>-?[\d.]+)\s+(?P<dop>Td|TD)",
    re.DOTALL,
)
_ARR_STR_RX = re.compile(
    r"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>", re.DOTALL
)

# ---------------------------------------------------------------------------
# ToUnicode CMap support (subset / CID fonts): hex show-strings decode
# through the font's bfchar/bfrange mapping instead of latin-1
# ---------------------------------------------------------------------------

_FONT_RES_RX = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_REF_RX = re.compile(rb"/([A-Za-z0-9_.+-]+)\s+(\d+)\s+0\s+R")
_TOUNI_RX = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_BFCHAR_RX = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RX = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXPAIR_RX = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEXTRIPLE_RX = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
    re.DOTALL,
)
_HEX_RX = re.compile(rb"<([0-9A-Fa-f]+)>")


def _object_body(raw: bytes, num: int) -> bytes | None:
    m = re.search(rb"(?<![0-9])%d\s+0\s+obj(.*?)endobj" % num, raw, re.DOTALL)
    return m.group(1) if m else None


def _stream_of(body: bytes) -> bytes | None:
    m = _STREAM_START_RX.search(body)
    if m is None:
        return None
    lm = _LENGTH_RX.search(body[: m.start()])
    if lm is not None:
        data = body[m.end() : m.end() + int(lm.group(1))]
    else:
        em = _ENDSTREAM_RX.search(body, m.end())
        data = body[m.end() : em.start() if em else len(body)]
    if b"/FlateDecode" in body[: m.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _u16s_to_str(hexs: bytes) -> str:
    """UTF-16BE code units from a CMap dst hex token."""
    b = bytes.fromhex(hexs.decode("ascii"))
    return b.decode("utf-16-be", errors="replace")


class _CMap:
    """A ToUnicode CMap: code (int, width bytes) -> unicode string."""

    def __init__(self, data: bytes):
        self.map: dict[int, str] = {}
        self.width = 2  # Identity-H default
        for seg in _BFCHAR_RX.findall(data):
            for src, dst in _HEXPAIR_RX.findall(seg):
                self.width = max(1, len(src) // 2)
                self.map[int(src, 16)] = _u16s_to_str(dst)
        for seg in _BFRANGE_RX.findall(data):
            for lo, hi, dst, arr in _HEXTRIPLE_RX.findall(seg):
                self.width = max(1, len(lo) // 2)
                lo_i, hi_i = int(lo, 16), int(hi, 16)
                if dst:
                    base = int(dst, 16)
                    for code in range(lo_i, hi_i + 1):
                        self.map[code] = chr(base + (code - lo_i))
                else:  # [<d1> <d2> ...] per code
                    dsts = _HEX_RX.findall(arr)
                    for code, d in zip(range(lo_i, hi_i + 1), dsts):
                        self.map[code] = _u16s_to_str(d)

    def decode_hex(self, hex_text: str) -> str:
        compact = "".join(hex_text.split())
        if len(compact) % 2:
            compact += "0"  # PDF spec: odd final digit implies trailing 0
        data = bytes.fromhex(compact)
        w = self.width
        out = []
        for i in range(0, len(data) - w + 1, w):
            code = int.from_bytes(data[i : i + w], "big")
            out.append(self.map.get(code, "�"))
        return "".join(out)


def _font_cmaps(raw: bytes) -> dict[str, _CMap]:
    """Font resource name -> ToUnicode CMap (fonts without one omitted)."""
    out: dict[str, _CMap] = {}
    for res in _FONT_RES_RX.findall(raw):
        for name, obj_num in _FONT_REF_RX.findall(res):
            body = _object_body(raw, int(obj_num))
            if body is None:
                continue
            tm = _TOUNI_RX.search(body)
            if tm is None:
                continue
            cmap_body = _object_body(raw, int(tm.group(1)))
            if cmap_body is None:
                continue
            data = _stream_of(cmap_body)
            if data:
                out[name.decode("latin-1")] = _CMap(data)
    return out

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
    cmaps: dict[str, _CMap] | None = None  # resolved on first hex/Tf sight
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
        if cmaps is None and "<" in s:
            # lazy: only streams with hex show-strings pay the font-walk;
            # literal-string PDFs (the common fast path) never do
            cmaps = _font_cmaps(raw)

        def hex_text(h: str) -> str:
            cm = (cmaps or {}).get(font)
            if cm is not None:
                return cm.decode_hex(h)
            compact = "".join(h.split())
            if len(compact) % 2:
                compact += "0"
            return bytes.fromhex(compact).decode("latin-1")

        x = y = 0.0
        font = ""
        for t in _TOK_RX.finditer(s):
            if t.group("sop"):
                runs.append((y, x, _unescape_pdf_string(t.group("str"))))
            elif t.group("hop"):
                runs.append((y, x, hex_text(t.group("hex"))))
            elif t.group("arr") is not None:
                parts = []
                for sm in _ARR_STR_RX.finditer(t.group("arr")):
                    tok = sm.group(0)
                    if tok.startswith("("):
                        parts.append(_unescape_pdf_string(tok[1:-1]))
                    else:
                        parts.append(hex_text(tok[1:-1]))
                runs.append((y, x, "".join(parts)))
            elif t.group("font"):
                font = t.group("font")
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
