"""HTML build + main-content extraction (boilerplate removal).

The reference has no HTML path (it reads pre-OCR'd text or single-page
PDFs, ``/root/reference/src/data.py:141-155``); the north star requires a
DOM text-density / link-density boilerplate stripper for Common-Crawl-style
pages. This is a from-scratch implementation of the public Arc90 /
Boilerpipe-style heuristic over Python's stdlib ``html.parser``:

- segment the DOM into *blocks* at block-level container boundaries;
- per block, measure total text length and anchor ("<a>") text length;
- drop script/style/noscript entirely and nav/header/footer/aside
  subtrees; drop blocks whose link density (anchor chars / total chars)
  exceeds ``MAX_LINK_DENSITY`` or that are shorter than ``MIN_BLOCK_CHARS``
  unless nothing else survives;
- join surviving blocks with newlines.

A page built by :func:`build_page` round-trips byte-identically:
``extract_main_text(build_page(text)) == text``.
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "td", "li", "h1", "h2", "h3",
    "h4", "h5", "h6", "pre", "blockquote", "table", "tr", "ul", "ol", "body",
}
DROP_SUBTREE_TAGS = {
    "script", "style", "noscript", "nav", "header", "footer", "aside", "title",
}

MAX_LINK_DENSITY = 0.33
MIN_BLOCK_CHARS = 2


class _Block:
    __slots__ = ("parts", "text_len", "link_len")

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.text_len = 0
        self.link_len = 0

    @property
    def text(self) -> str:
        return "".join(self.parts)

    @property
    def link_density(self) -> float:
        return self.link_len / self.text_len if self.text_len else 1.0


class _Extractor(HTMLParser):
    """stdlib-tokenizer front end over the shared block state machine
    (the fast scanner below is the product path; this is the robustness
    reference both are property-tested against)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.model = _BlockModel()

    @property
    def blocks(self) -> list["_Block"]:
        return self.model.blocks

    def handle_starttag(self, tag: str, attrs) -> None:
        self.model.on_start(tag)

    def handle_endtag(self, tag: str) -> None:
        self.model.on_end(tag)

    def handle_data(self, data: str) -> None:
        self.model.on_data(data)


# -- fast tag scanner ---------------------------------------------------------
#
# The stdlib HTMLParser spends most of its time in parse_starttag's
# attribute machinery, which this extractor never uses (43% of the fused
# extraction stage in profile). This scanner recognises just what the
# block model needs — tag name, open/close, comments/decls, script/style
# raw-text skipping, charref conversion in data — with one compiled regex
# and str.find. Equivalence with the stdlib-parser path is property-tested
# (tests/test_readers.py::TestHtmlScannerParity).

_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:--!?>|$)"                    # comment (unterminated: to EOF)
    r"|!\[CDATA\[.*?(?:\]\]>|$)"            # CDATA section
    r"|[!?][^>]*>"                          # doctype / declaration / PI
    r"|(?P<close>/)?(?P<name>[a-zA-Z][^\t\n\r\f />]*)"
    r"(?:\"[^\"]*\"|'[^']*'|[^'\">])*>"     # attrs ('>' inside quotes ok)
    r")",
    re.S,
)
_RAWTEXT_TAGS = ("script", "style")  # CDATA content until the closing tag
_RAWTEXT_END = {
    t: re.compile(rf"</{t}(?:\s[^>]*)?>", re.I) for t in _RAWTEXT_TAGS
}


class _BlockModel:
    """The block-segmentation state machine, decoupled from tokenization
    so the stdlib parser (reference) and the fast scanner feed the same
    logic."""

    __slots__ = ("blocks", "_drop_depth", "_anchor_depth")

    def __init__(self) -> None:
        self.blocks: list[_Block] = [_Block()]
        self._drop_depth = 0
        self._anchor_depth = 0

    def _new_block(self) -> None:
        if self.blocks[-1].parts:
            self.blocks.append(_Block())

    def on_start(self, tag: str) -> None:
        if tag in DROP_SUBTREE_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in BLOCK_TAGS or tag == "br":
            self._new_block()

    def on_end(self, tag: str) -> None:
        if tag in DROP_SUBTREE_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in BLOCK_TAGS:
            self._new_block()

    def on_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        b = self.blocks[-1]
        b.parts.append(data)
        n = len(data.strip())
        b.text_len += n
        if self._anchor_depth:
            b.link_len += n


def _scan(doc: str, model: _BlockModel) -> None:
    pos, n = 0, len(doc)
    find = doc.find
    on_data = model.on_data
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            chunk = doc[pos:]
            on_data(_html.unescape(chunk) if "&" in chunk else chunk)
            return
        if lt > pos:
            chunk = doc[pos:lt]
            on_data(_html.unescape(chunk) if "&" in chunk else chunk)
        m = _TAG_RE.match(doc, lt)
        if m is None:  # bare '<' — tolerant: treat as data
            on_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        name = m.group("name")
        if not name:  # comment / decl / CDATA
            continue
        name = name.lower()
        if m.group("close"):
            model.on_end(name)
            continue
        model.on_start(name)
        if m.group(0).endswith("/>"):  # self-closing, like handle_startendtag
            model.on_end(name)
            continue
        if name in _RAWTEXT_TAGS:  # skip CDATA content to the closing tag
            em = _RAWTEXT_END[name].search(doc, pos)
            if em is None:
                model.on_data(doc[pos:])
                return
            model.on_data(doc[pos : em.start()])
            model.on_end(name)
            pos = em.end()


def _select_blocks(blocks: list[_Block]) -> str:
    candidates = [
        b for b in blocks
        if b.text_len >= MIN_BLOCK_CHARS and b.link_density <= MAX_LINK_DENSITY
    ]
    if not candidates:  # degenerate page: fall back to the densest block
        nonempty = [b for b in blocks if b.text_len > 0]
        if not nonempty:
            return ""
        candidates = [max(nonempty, key=lambda b: b.text_len - b.link_len)]
    return "\n".join(b.text.strip("\n") for b in candidates if b.text.strip())


def extract_main_text(html_doc: str | bytes) -> str:
    """Strip boilerplate, return the page's main text content (fast
    scanner path)."""
    if isinstance(html_doc, (bytes, bytearray, memoryview)):
        html_doc = bytes(html_doc).decode("utf-8", errors="replace")
    model = _BlockModel()
    _scan(html_doc, model)
    return _select_blocks(model.blocks)


def extract_main_text_reference(html_doc: str | bytes) -> str:
    """Same extraction through the stdlib HTMLParser tokenizer — the
    robustness reference the fast scanner is property-tested against."""
    if isinstance(html_doc, (bytes, bytearray, memoryview)):
        html_doc = bytes(html_doc).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html_doc)
    p.close()
    return _select_blocks(p.blocks)


_NAV = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About us</a></li>'
    '<li><a href="/contact">Contact</a></li><li><a href="/login">Login</a></li></ul></nav>'
)
_FOOTER = (
    '<footer><a href="/terms">Terms of Service</a> | <a href="/privacy">Privacy'
    "</a> | <a href=\"/sitemap\">Sitemap</a> | © example.org</footer>"
)
_ASIDE = (
    '<aside><a href="/ad1">Sponsored link one</a><a href="/ad2">Sponsored link two'
    '</a><a href="/ad3">More sponsored</a></aside>'
)


def build_page(text: str, title: str = "Document") -> bytes:
    """Wrap text in a boilerplate-laden HTML page (content in <article>)."""
    body = _html.escape(text)
    doc = (
        "<!DOCTYPE html><html><head><style>body{margin:0}</style>"
        f"<title>{_html.escape(title)}</title>"
        '<script>var trackingId="x-123";</script></head><body>'
        f"{_NAV}{_ASIDE}<article>{body}</article>{_FOOTER}</body></html>"
    )
    return doc.encode("utf-8")
