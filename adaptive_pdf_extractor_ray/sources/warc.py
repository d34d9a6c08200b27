"""WARC (ISO 28500 Web ARChive) ingest — the native container format of
Common-Crawl-style corpora.

Two pieces:

- ``parse_warc_records``: a from-scratch record parser over raw bytes.
  Framing honors ``Content-Length`` exactly (never splits on payload
  content, so an HTTP body containing ``\\r\\n\\r\\n`` parses correctly)
  and tolerates/skips non-``response`` records (``warcinfo``,
  ``request``) the way a fetch pipeline's reader must.
- ``write_warc_corpus``: a deterministic fixture generator that emits
  real WARC/1.0 bytes PLUS an independent ground-truth parquet table of
  what a correct parse must produce — the oracle side of the
  ``warc_roundtrip`` query reads only the truth table, the Ray side
  reads only the WARC bytes.

Scale shape: the WARC FILE is the unit of parallelism
(``ray.data.read_binary_files`` -> one row per shard -> record parse
inside ``map_batches``), matching how Common Crawl distributes work
(one ~1 GiB ``.warc.gz`` per task). For files too big for one block,
the same parser drops into a streaming ``FileBasedDatasource`` that
yields record batches incrementally — the framing is forward-only and
needs no lookbehind, so that swap is mechanical.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    """Parse a CRLF-separated header block into a dict (first line —
    the version / status line — is stored under '' )."""
    lines = block.split(CRLF)
    out: dict[str, str] = {"": lines[0].decode("latin-1")}
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(b":")
        out[k.decode("latin-1").strip().lower()] = v.decode(
            "latin-1"
        ).strip()
    return out


def parse_warc_stream(
    buf: bytes, base_offset: int = 0
) -> tuple[list[dict], int]:
    """Incremental framing core: parse every COMPLETE ``response``
    record out of ``buf``, returning ``(records, consumed)`` where
    ``consumed`` is how many leading bytes hold fully-parsed (or
    skipped non-response) records. A record whose header block or
    payload extends past the buffer is left untouched — the streaming
    reader appends more bytes and retries; a malformed record boundary
    also stops consumption (truncated/corrupt tail). ``base_offset`` is
    the file offset of ``buf[0]`` so record offsets stay file-absolute
    across chunks."""
    out: list[dict] = []
    pos = 0
    consumed = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while buf.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            consumed = pos
            break
        rec_start = pos
        if not buf.startswith(b"WARC/", pos):
            break  # corrupt boundary: stop, keep what we parsed
        hdr_end = buf.find(_HDR_END, pos)
        if hdr_end < 0:
            break  # header incomplete: wait for more bytes
        hdrs = _parse_headers(buf[pos:hdr_end])
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            break
        end = hdr_end + 4 + clen
        if end > n:
            break  # payload incomplete: wait for more bytes
        payload = buf[hdr_end + 4 : end]
        pos = end
        consumed = pos
        rec_len = pos - rec_start  # headers + payload, pre-separator
        if hdrs.get("warc-type") != "response":
            continue
        # payload is an HTTP response: status line + headers, then body.
        # Split at the FIRST CRLFCRLF only — the body may contain more.
        sep = payload.find(_HDR_END)
        if sep < 0:
            continue
        http = _parse_headers(payload[:sep])
        status_line = http[""].split(" ")
        status = int(status_line[1]) if len(status_line) > 1 else 0
        body = payload[sep + 4 :]
        out.append(
            {
                "url": hdrs.get("warc-target-uri", ""),
                "warc_date": hdrs.get("warc-date", ""),
                "status": status,
                "n_bytes": len(body),
                "text": body.decode("utf-8", errors="replace"),
                # random-access coordinates for a CDX index: byte offset
                # of the record start and record length (headers+payload)
                "offset": base_offset + rec_start,
                "length": rec_len,
            }
        )
    return out, consumed


def parse_warc_records(data: bytes) -> list[dict]:
    """Parse every ``response`` record out of one WARC file's bytes
    (whole-buffer convenience over ``parse_warc_stream``: complete
    records parse, a truncated tail is dropped)."""
    return parse_warc_stream(data)[0]


def surt_key(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) canonical key —
    the urlkey column of a CDX index: host labels reversed and
    comma-joined, default ports and a leading 'www.' dropped, lowercase
    scheme/host, path kept as-is after ')'. Subset of the full SURT
    spec sufficient for exact-host CC-style lookups."""
    rest = url.split("://", 1)[1] if "://" in url else url
    hostport, slash, path = rest.partition("/")
    host = hostport.rsplit(":", 1)[0] if ":" in hostport else hostport
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    return ",".join(reversed(host.split("."))) + ")/" + (
        path if slash else ""
    )


def _records_table(rows: list[dict], warc_file: str) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_date": pa.array(
                [r["warc_date"] for r in rows], pa.string()
            ),
            "status": pa.array([r["status"] for r in rows], pa.int64()),
            "n_bytes": pa.array([r["n_bytes"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "warc_file": pa.array([warc_file] * len(rows), pa.string()),
            "rec_offset": pa.array([r["offset"] for r in rows], pa.int64()),
            "rec_length": pa.array([r["length"] for r in rows], pa.int64()),
        }
    )


try:  # Ray is optional at import time (pure-parser use in tests/tools)
    from ray.data.datasource.file_based_datasource import (
        FileBasedDatasource,
    )

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC source: yields record-batch blocks
        INCREMENTALLY from each file instead of materializing whole
        files as single rows — the scale path for warc files larger
        than a block (real CC shards are ~1 GiB; a whole-file
        ``read_binary_files`` row would blow the object-store block
        target). Reads ``chunk_bytes`` at a time, frames complete
        records with ``parse_warc_stream`` (forward-only, no
        lookbehind), and emits a block every ``records_per_block``
        responses, so peak memory per read task is
        O(chunk + one block), independent of file size."""

        _FILE_EXTENSIONS = ["warc"]

        def __init__(self, paths, *, records_per_block: int = 512,
                     chunk_bytes: int = 4 << 20, **kwargs):
            kwargs.setdefault("file_extensions", ["warc"])
            super().__init__(paths, **kwargs)
            self._rpb = records_per_block
            self._chunk = chunk_bytes

        def _read_stream(self, f, path: str):
            fname = os.path.basename(path)
            buf = b""
            base = 0
            rows: list[dict] = []
            while True:
                chunk = f.read(self._chunk)
                if chunk:
                    buf += chunk
                recs, consumed = parse_warc_stream(buf, base)
                if consumed:
                    buf = buf[consumed:]
                    base += consumed
                rows.extend(recs)
                while len(rows) >= self._rpb:
                    yield _records_table(rows[: self._rpb], fname)
                    rows = rows[self._rpb :]
                if not chunk:  # EOF: emit the tail, drop truncated bytes
                    break
            if rows:
                yield _records_table(rows, fname)

except ImportError:  # pragma: no cover
    WarcDatasource = None  # type: ignore[assignment]


# --------------------------------------------------------------------------
# deterministic fixture
# --------------------------------------------------------------------------

def _record(kind: str, extra_headers: list[tuple[str, str]],
            payload: bytes) -> bytes:
    head = [b"WARC/1.0"]
    head.append(b"WARC-Type: " + kind.encode())
    for k, v in extra_headers:
        head.append(f"{k}: {v}".encode())
    head.append(f"Content-Length: {len(payload)}".encode())
    return CRLF.join(head) + _HDR_END + payload + CRLF + CRLF


def _page_html(i: int) -> str:
    words = " ".join(f"word{(i * 7 + j) % 23}" for j in range(10 + i % 5))
    # every 13th body embeds a literal CRLFCRLF — a parser that frames
    # records by scanning for the separator instead of honoring
    # Content-Length breaks on exactly this input
    trap = "x\r\n\r\ny" if i % 13 == 0 else ""
    return (
        f"<html><head><title>Page {i}</title></head>"
        f"<body><p>{words}</p>{trap}</body></html>"
    )


def write_warc_corpus(
    root: str, n: int = 240, shards: int = 4
) -> tuple[str, str]:
    """Write ``shards`` WARC files of ``n`` total response records (plus
    interleaved warcinfo/request noise records) and the independent
    ground-truth parquet. Idempotent via a manifest. Returns
    (warc_dir, truth_dir)."""
    warc_dir = os.path.join(root, "warc")
    truth_dir = os.path.join(root, "truth")
    marker = os.path.join(root, "_manifest.json")
    want = {"kind": "warc", "n": n, "shards": shards, "v": 2}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return warc_dir, truth_dir
    os.makedirs(warc_dir, exist_ok=True)
    os.makedirs(truth_dir, exist_ok=True)
    truth: dict[str, list] = {
        "url": [], "warc_date": [], "status": [], "n_bytes": [], "text": [],
        "warc_file": [], "offset": [], "length": [],
    }
    per = (n + shards - 1) // shards
    for s in range(shards):
        chunks = [
            _record(
                "warcinfo",
                [("WARC-Record-ID", f"<urn:uuid:{s:032x}>")],
                f"software: aper-fixture shard {s}\r\n".encode(),
            )
        ]
        written = len(chunks[0])  # running byte offset within the shard
        for i in range(s * per, min((s + 1) * per, n)):
            url = f"https://w{i % 9}.example/page{i}"
            date = (
                f"2024-01-{1 + i % 28:02d}T{i % 24:02d}:"
                f"{i % 60:02d}:{(i * 7) % 60:02d}Z"
            )
            rid = hashlib.md5(f"rec{i}".encode()).hexdigest()
            if i % 5 == 0:  # request-record noise the parser must skip
                req = _record(
                    "request",
                    [("WARC-Target-URI", url), ("WARC-Date", date)],
                    f"GET /page{i} HTTP/1.1\r\nHost: h\r\n\r\n".encode(),
                )
                chunks.append(req)
                written += len(req)
            status, reason = (404, "Not Found") if i % 17 == 0 else (200, "OK")
            body = _page_html(i).encode("utf-8")
            http = (
                f"HTTP/1.1 {status} {reason}\r\n"
                "Content-Type: text/html; charset=utf-8\r\n\r\n"
            ).encode() + body
            rec = _record(
                "response",
                [
                    ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
                    ("WARC-Target-URI", url),
                    ("WARC-Date", date),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
            chunks.append(rec)
            truth["url"].append(url)
            truth["warc_date"].append(date)
            truth["status"].append(status)
            truth["n_bytes"].append(len(body))
            truth["text"].append(body.decode("utf-8"))
            truth["warc_file"].append(f"shard{s}.warc")
            truth["offset"].append(written)
            truth["length"].append(len(rec) - 4)  # sans record separator
            written += len(rec)
        tmp = os.path.join(warc_dir, f"shard{s}.warc.tmp")
        with open(tmp, "wb") as f:
            f.write(b"".join(chunks))
        os.replace(tmp, os.path.join(warc_dir, f"shard{s}.warc"))
    t = pa.table(
        {
            "url": pa.array(truth["url"], pa.string()),
            "warc_date": pa.array(truth["warc_date"], pa.string()),
            "status": pa.array(truth["status"], pa.int64()),
            "n_bytes": pa.array(truth["n_bytes"], pa.int64()),
            "text": pa.array(truth["text"], pa.string()),
            "warc_file": pa.array(truth["warc_file"], pa.string()),
            "offset": pa.array(truth["offset"], pa.int64()),
            "length": pa.array(truth["length"], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(truth_dir, "truth.parquet"))
    with open(marker, "w") as f:
        json.dump(want, f)
    return warc_dir, truth_dir
