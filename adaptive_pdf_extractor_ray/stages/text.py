"""Text-analysis stages for large-scale training-data pipelines.

All operate on a string column via vectorized ``map_batches`` (pyarrow /
numpy kernels); each has an exactly-mirroring DuckDB SQL oracle in
``__ray_entry__.oracle_sql`` so the driver can verify value parity.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# must stay in sync with the SQL oracle in __ray_entry__.py
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
TOKEN_PATTERN = r"\S+"


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    counts = pc.count_substring_regex(batch[col], pattern=TOKEN_PATTERN)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(counts, pa.int64()),
        }
    )


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality-scoring features: lengths, stopword ratio, punct ratio.

    Ratios are rounded to 6 dp so distributed and SQL evaluation hash
    identically.
    """
    text = batch[col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, pattern=TOKEN_PATTERN), pa.int64())
    n_stop = None
    for w in STOPWORDS:
        c = pc.count_substring_regex(text, pattern=rf"\b{w}\b")
        n_stop = c if n_stop is None else pc.add(n_stop, c)
    n_punct = pc.count_substring_regex(text, pattern=r"[^\w\s]")
    tok_safe = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    chr_safe = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    stop_ratio = pc.round(
        pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(tok_safe, pa.float64())),
        ndigits=6,
    )
    punct_ratio = pc.round(
        pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(chr_safe, pa.float64())),
        ndigits=6,
    )
    mean_tok_len = pc.round(
        pc.divide(pc.cast(n_chars, pa.float64()), pc.cast(tok_safe, pa.float64())),
        ndigits=6,
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "stop_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "mean_tok_len": mean_tok_len,
        }
    )


def lang_id_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Stopword-density language heuristic (en vs und), SQL-mirrorable."""
    text = batch[col]
    n_tokens = pc.cast(pc.count_substring_regex(text, pattern=TOKEN_PATTERN), pa.int64())
    n_stop = None
    for w in STOPWORDS:
        c = pc.count_substring_regex(text, pattern=rf"\b{w}\b")
        n_stop = c if n_stop is None else pc.add(n_stop, c)
    tok_safe = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    ratio = pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(tok_safe, pa.float64()))
    pred = pc.if_else(pc.greater(ratio, 0.05), pa.scalar("en"), pa.scalar("und"))
    return pa.table({"doc_id": batch["doc_id"], "predicted_lang": pred})


def md5_hex_array(values: list[str | None]) -> pa.Array:
    return pa.array(
        [None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest() for v in values],
        pa.string(),
    )


def content_hash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Exact-dedup key: md5 of the raw text (matches DuckDB md5())."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "content_md5": md5_hex_array(batch[col].to_pylist()),
        }
    )


# -- rolling-hash document fingerprint (non-SQL op) -------------------------

_B = np.uint64(1000003)
_MASK = np.uint64((1 << 61) - 1)


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Polynomial rolling hash fingerprint: min of window hashes over bytes
    (a deterministic winnowing-style document fingerprint)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(data) == 0:
        return 0
    if len(data) < window:
        window = len(data)
    return int(_rolling_accs(data, window).min())


def rolling_fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint64": pa.array(
                [rolling_fingerprint(t or "") for t in batch[col].to_pylist()],
                pa.int64(),
            ),
        }
    )


CDC_DIV = 64  # breakpoint divisor -> ~64-byte average chunks
CDC_WINDOW = 16  # rolling window (shared with the winnowing fingerprint)


def _rolling_accs(data: np.ndarray, window: int) -> np.ndarray:
    """The window-hash array of ``rolling_fingerprint`` (h[i] = hash of
    the window ENDING at 1-based byte position i + window), factored out
    so CDC chunking and winnowing share one recurrence — and therefore
    one SQL replication (the iterative HUGEINT CTE)."""
    h = np.zeros(len(data) - window + 1, dtype=np.uint64)
    acc = np.uint64(0)
    with np.errstate(over="ignore"):
        for i in range(window):
            acc = (acc * _B + data[i]) & _MASK
        h[0] = acc
        bw = np.uint64(1)
        for _ in range(window - 1):
            bw = (bw * _B) & _MASK
        for i in range(1, len(h)):
            acc = ((acc - data[i - 1] * bw) * _B + data[i + window - 1]) & _MASK
            h[i] = acc
    return h


def cdc_chunk_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Content-defined chunking (Rabin-style CDC): cut each doc's UTF-8
    byte stream AFTER position t wherever the rolling window hash ending
    at t is ≡ 0 mod ``CDC_DIV`` (plus a forced cut at end-of-doc), then
    key each chunk by md5 of its bytes. Because breakpoints depend only
    on local content, an insertion near the head of a page shifts
    boundaries only until the next breakpoint — downstream chunks
    re-align and still dedup, which is what positional/fixed-size
    chunking can never do (the LBFS/rsync trick, Muthitacharoen et al.
    2001). No minimum-chunk constraint: cut positions are then a pure
    function of the byte stream (stateless), which keeps the SQL
    replication exact. Zero-length docs emit no chunks (documented
    contract). md5 is taken over the UPPERCASE hex of the chunk bytes —
    byte-identical to DuckDB's ``md5(substr(to_hex(encode(text)), ..))``."""
    ids_out: list[int] = []
    idx_out: list[int] = []
    ck_out: list[str] = []
    len_out: list[int] = []
    for did, t in zip(batch["doc_id"].to_pylist(), batch[col].to_pylist()):
        data = (t or "").encode("utf-8")
        n = len(data)
        if n == 0:
            continue
        w = min(CDC_WINDOW, n)
        h = _rolling_accs(
            np.frombuffer(data, dtype=np.uint8).astype(np.uint64), w
        )
        cuts = sorted(
            {t_ for t_ in range(w, n + 1) if int(h[t_ - w]) % CDC_DIV == 0}
            | {n}
        )
        start = 0
        for ci, end in enumerate(cuts):
            chunk = data[start:end]
            ids_out.append(did)
            idx_out.append(ci)
            ck_out.append(
                hashlib.md5(chunk.hex().upper().encode("ascii")).hexdigest()
            )
            len_out.append(end - start)
            start = end
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "chunk_idx": pa.array(idx_out, pa.int64()),
            "ck": pa.array(ck_out, pa.string()),
            "clen": pa.array(len_out, pa.int64()),
        }
    )


class Decontaminate:
    """Benchmark decontamination: flag documents whose text contains any
    of a bounded set of benchmark phrases (the GPT-3 / Pile training-set
    decontamination step). The phrase set is broadcast once per actor as
    PLAIN constructor values (restart-safe, ray#53727) and each phrase is
    matched with the vectorized ``pc.match_substring`` kernel over the
    whole column — O(phrases) Arrow kernel calls per batch, never a
    Python loop over rows. A doc counts each phrase at most once
    (containment, not occurrences)."""

    def __init__(self, phrases: list[str], col: str = "text"):
        self.phrases = [p for p in phrases if p]
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.col]
        n = len(batch)
        hits = np.zeros(n, dtype=np.int64)
        for p in self.phrases:
            m = pc.match_substring(text, pattern=p)
            hits += np.asarray(
                pc.fill_null(m, False), dtype=bool
            ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(
                    (hits > 0).astype(np.int32), pa.int32()
                ),
            }
        )


# -- PII redaction (webtext hygiene) -----------------------------------------
#
# Patterns are RE2-compatible and behave identically in Arrow
# (pc.replace_substring_regex) and DuckDB (regexp_replace(..., 'g')) so the
# operator is value-verifiable. Replacement order is fixed: URL first (so an
# address inside a URL never leaks into the email pass), then email, then
# phone (the earlier passes leave no digit-hyphen runs behind).
PII_URL = r"http://[^ ]+"
PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{4}"


def pii_redact_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Count + redact URLs / emails / phone numbers in one vectorized pass
    (three count kernels + three replace kernels per batch, no row loop)."""
    text = batch[col]
    n_urls = pc.cast(pc.count_substring_regex(text, pattern=PII_URL), pa.int64())
    n_emails = pc.cast(pc.count_substring_regex(text, pattern=PII_EMAIL), pa.int64())
    n_phones = pc.cast(pc.count_substring_regex(text, pattern=PII_PHONE), pa.int64())
    clean = pc.replace_substring_regex(text, pattern=PII_URL, replacement="<URL>")
    clean = pc.replace_substring_regex(clean, pattern=PII_EMAIL, replacement="<EMAIL>")
    clean = pc.replace_substring_regex(clean, pattern=PII_PHONE, replacement="<PHONE>")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean": clean,
            "n_urls": n_urls,
            "n_emails": n_emails,
            "n_phones": n_phones,
        }
    )


# -- corpus-level line dedup (CCNet / RefinedWeb boilerplate removal) --------

LINE_TOKENS = 8  # content-line width when deriving pages from documents


def doc_lines(source: str, lang: str, text: str) -> list[str]:
    """Deterministic multi-line page derived from a documents row: a
    header shared by every doc of the same source, LINE_TOKENS-word
    content lines, and a footer shared per lang — the repeated-boilerplate
    structure corpus-level line dedup exists to remove. The SQL oracle
    reconstructs the identical page."""
    words = [w for w in (text or "").split(" ") if w]
    lines = [f"home about contact {source} navigation menu"]
    for i in range(0, len(words), LINE_TOKENS):
        lines.append(" ".join(words[i : i + LINE_TOKENS]))
    lines.append(f"copyright footer {lang} all rights reserved")
    return lines


def line_count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial doc-frequency per line hash. Lines are deduped
    within each doc first, so partials are summable across batches (each
    doc lives in exactly one batch); only (16-byte-hash, count) rows ever
    reach the shuffle — never line text, never corpus-sized."""
    counts: dict[str, int] = {}
    for src, lang, t in zip(
        batch["source"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["text"].to_pylist(),
    ):
        for ln in set(doc_lines(src, lang, t)):
            h = hashlib.md5(ln.encode("utf-8")).hexdigest()
            counts[h] = counts.get(h, 0) + 1
    return pa.table(
        {
            "line_md5": pa.array(list(counts.keys()), pa.string()),
            "nd": pa.array(list(counts.values()), pa.int64()),
        }
    )


class LineDedup:
    """Second pass of corpus-level line dedup: re-derive each doc's lines
    and drop members of the broadcast frequent-line set (boilerplate).
    The set is bounded (lines repeated across >= min_docs docs), shipped
    once per actor as plain constructor values."""

    def __init__(self, drop_hashes: set[str]):
        self.drop = drop_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_lines, n_kept, texts = [], [], [], []
        for did, src, lang, t in zip(
            batch["doc_id"].to_pylist(),
            batch["source"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            lines = doc_lines(src, lang, t)
            kept = [
                ln
                for ln in lines
                if hashlib.md5(ln.encode("utf-8")).hexdigest() not in self.drop
            ]
            ids.append(did)
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            texts.append("\n".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "text_clean": pa.array(texts, pa.string()),
            }
        )


def domain_line_count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial doc-frequency per (domain, line hash) — the
    per-domain variant of `line_count_partials` (CCNet shards by
    snapshot/language; RefinedWeb removes lines repeated WITHIN a site,
    so a nav bar common to one domain goes while a sentence that happens
    to recur across unrelated sites stays). Lines are deduped within
    each doc first, so partials are summable; only
    (source, 16-byte-hash, count) rows reach the shuffle — never text."""
    counts: dict[tuple[str, str], int] = {}
    for src, lang, t in zip(
        batch["source"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["text"].to_pylist(),
    ):
        for ln in set(doc_lines(src, lang, t)):
            h = hashlib.md5(ln.encode("utf-8")).hexdigest()
            counts[(src, h)] = counts.get((src, h), 0) + 1
    srcs = [k[0] for k in counts]
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "line_md5": pa.array([k[1] for k in counts], pa.string()),
            "nd": pa.array(list(counts.values()), pa.int64()),
        }
    )


class LineDedupDomain:
    """Second pass of per-domain line dedup: re-derive each doc's lines
    and drop the ones whose (domain, hash) is in the broadcast frequent
    set. Same restart-safe plain-constructor-value shape as LineDedup."""

    def __init__(self, drop_keys: set[tuple[str, str]]):
        self.drop = drop_keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_lines, n_kept, texts = [], [], [], []
        for did, src, lang, t in zip(
            batch["doc_id"].to_pylist(),
            batch["source"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            lines = doc_lines(src, lang, t)
            kept = [
                ln
                for ln in lines
                if (src, hashlib.md5(ln.encode("utf-8")).hexdigest())
                not in self.drop
            ]
            ids.append(did)
            n_lines.append(len(lines))
            n_kept.append(len(kept))
            texts.append("\n".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "text_clean": pa.array(texts, pa.string()),
            }
        )


# -- C4-style page cleaning (Raffel et al. 2020 §2.2 line/doc rules) ---------

C4_MIN_LINE_WORDS = 5  # C4 keeps lines with >= 5 words
C4_MIN_KEPT_LINES = 3  # ... and pages that retain >= 3 lines
C4_TERMINALS = (".", "!", "?", '"')


def c4_page_lines(doc_id: int, text: str) -> list[str]:
    """Deterministic noisy page derived from a documents row, built so
    every C4 rule has rows it fires on: LINE_TOKENS-word content lines
    whose terminal punctuation cycles ('.', none, '!', '?') with
    (doc_id + line_no) % 4, a cookie/JS interstitial on doc_id % 7, a
    lorem-ipsum stub on doc_id % 31 and a code fragment (curly brace) on
    doc_id % 29. The SQL oracle rebuilds the identical page."""
    words = [w for w in (text or "").split(" ") if w]
    lines: list[str] = []
    if doc_id % 7 == 0:
        lines.append("please enable javascript and cookies to continue.")
    for i in range(0, len(words), LINE_TOKENS):
        n = i // LINE_TOKENS
        term = [".", "", "!", "?"][(doc_id + n) % 4]
        lines.append(" ".join(words[i : i + LINE_TOKENS]) + term)
    if doc_id % 31 == 0:
        lines.append("lorem ipsum dolor sit amet consectetur adipiscing elit.")
    if doc_id % 29 == 0:
        lines.append("function badge() { return 1; }")
    return lines


def c4_clean_batch(batch: pa.Table) -> pa.Table:
    """C4 cleaning pass over the derived pages — line rules: keep a line
    iff it ends in terminal punctuation, has >= C4_MIN_LINE_WORDS words
    and does not mention 'javascript'; page rules: drop the whole page
    if fewer than C4_MIN_KEPT_LINES lines survive, or the RAW page
    contains 'lorem ipsum' or a '{'. Rules are evaluated on the text
    itself (the doc_id injections above only guarantee coverage).
    Emits surviving docs only."""
    ids, n_lines_col, n_kept_col, texts = [], [], [], []
    for did, t in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        lines = c4_page_lines(did, t)
        page = "\n".join(lines)
        low = page.lower()
        if "lorem ipsum" in low or "{" in page:
            continue
        kept = [
            ln
            for ln in lines
            if ln.endswith(C4_TERMINALS)
            and len(ln.split(" ")) >= C4_MIN_LINE_WORDS
            and "javascript" not in ln.lower()
        ]
        if len(kept) < C4_MIN_KEPT_LINES:
            continue
        ids.append(did)
        n_lines_col.append(len(lines))
        n_kept_col.append(len(kept))
        texts.append("\n".join(kept))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_lines": pa.array(n_lines_col, pa.int64()),
            "n_kept": pa.array(n_kept_col, pa.int64()),
            "text_clean": pa.array(texts, pa.string()),
        }
    )


# -- training-sequence chunking ----------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def chunk_windows_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Fixed-size token windows with overlap (training-sequence prep):
    window = CHUNK_TOKENS words, stride = CHUNK_STRIDE. Emits one row per
    (doc, window); the per-row split/join is inherent tokenize work."""
    ids, chunk_ids, n_toks, chunks = [], [], [], []
    for did, t in zip(batch["doc_id"].to_pylist(), batch[col].to_pylist()):
        words = [w for w in (t or "").split(" ") if w]
        if not words:
            continue
        for ci, start in enumerate(range(0, len(words), CHUNK_STRIDE)):
            win = words[start : start + CHUNK_TOKENS]
            ids.append(did)
            chunk_ids.append(ci)
            n_toks.append(len(win))
            chunks.append(" ".join(win))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_id": pa.array(chunk_ids, pa.int64()),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "chunk": pa.array(chunks, pa.string()),
        }
    )


def bigram_partials(batch: pa.Table, col: str = "text") -> pa.Table:
    """Per-batch partial counts of adjacent word pairs — the combiner
    shape: the groupby shuffles O(distinct bigrams per batch), never one
    row per occurrence."""
    counts: dict[str, int] = {}
    for t in batch[col].to_pylist():
        words = [w for w in (t or "").split(" ") if w]
        for a, b in zip(words, words[1:]):
            bg = a + " " + b
            counts[bg] = counts.get(bg, 0) + 1
    return pa.table(
        {
            "bigram": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        }
    )


# -- repeated-substring dedup (Lee et al. 2022, stride-window shape) ---------

SUBSTR_W = 16  # tokens per window
SUBSTR_STRIDE = 8  # window start alignment


def substr_window_marks(batch: pa.Table, col: str = "text") -> pa.Table:
    """One row per stride-aligned SUBSTR_W-token window occurrence:
    (h = md5 of the window text, doc_id, pos = 0-based token start).
    Only hashes ever reach the shuffle, never window text."""
    hs, ds_, ps = [], [], []
    for did, t in zip(batch["doc_id"].to_pylist(), batch[col].to_pylist()):
        words = [w for w in (t or "").split(" ") if w]
        for start in range(0, len(words) - SUBSTR_W + 1, SUBSTR_STRIDE):
            w = " ".join(words[start : start + SUBSTR_W])
            hs.append(hashlib.md5(w.encode("utf-8")).hexdigest())
            ds_.append(did)
            ps.append(start)
    return pa.table(
        {
            "h": pa.array(hs, pa.string()),
            "doc_id": pa.array(ds_, pa.int64()),
            "pos": pa.array(ps, pa.int64()),
        }
    )


def covered_positions_group(g: pa.Table) -> pa.Table:
    """Per-doc group of shared-window starts -> one row with the sorted
    start list, comma-encoded as a string (Arrow's acero hash join
    rejects list-typed non-key columns); expansion to full
    [start, start+W) ranges happens at rebuild, keeping the shuffled
    payload at one int per window."""
    starts = sorted(set(g["pos"].to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array([g["doc_id"][0].as_py()], pa.int64()),
            "starts": pa.array(
                [",".join(str(s) for s in starts)], pa.string()
            ),
        }
    )


def rebuild_dedup_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Remove covered tokens ([s, s+SUBSTR_W) per shared-window start s)
    and reassemble the doc text; docs with no marks pass through whole."""
    ids, n_tok, n_rm, texts = [], [], [], []
    starts_col = batch["starts"].to_pylist()
    for did, t, starts in zip(
        batch["doc_id"].to_pylist(), batch[col].to_pylist(), starts_col
    ):
        words = [w for w in (t or "").split(" ") if w]
        covered: set[int] = set()
        for s in starts.split(",") if starts else []:
            covered.update(range(int(s), int(s) + SUBSTR_W))
        kept = [w for i, w in enumerate(words) if i not in covered]
        ids.append(did)
        n_tok.append(len(words))
        n_rm.append(len(words) - len(kept))
        texts.append(" ".join(kept))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_removed": pa.array(n_rm, pa.int64()),
            "text_dedup": pa.array(texts, pa.string()),
        }
    )


# -- n-gram decontamination (GPT-3 / Pile style overlap check) ---------------

DECON_NGRAM = 8  # words per contamination gram (GPT-3 used 13)


def doc_ngrams(text: str | None, n: int = DECON_NGRAM) -> set[str]:
    """Distinct word n-grams of a document (split on single spaces,
    empty tokens dropped — the corpus-wide tokenization contract)."""
    words = [w for w in (text or "").split(" ") if w]
    return {
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    }


class NgramDecontaminate:
    """Benchmark decontamination by n-gram overlap (the GPT-3 /
    Pile method — stronger than substring containment, which misses
    paraphrased surroundings): a doc is contaminated iff it shares any
    word n-gram with the benchmark set. The benchmark gram set is
    bounded (a fixed eval suite, never corpus-sized) and ships as plain
    constructor values; at 100 TB ship the md5 hashes of the grams
    instead of the strings (same membership test, 16 bytes/gram)."""

    def __init__(self, bench_grams: set[str] | list[str]):
        self.bench = set(bench_grams)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hits, flag = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            shared = doc_ngrams(t) & self.bench
            ids.append(did)
            hits.append(len(shared))
            flag.append(1 if shared else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_gram_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(flag, pa.int32()),
            }
        )


# quality-tier cut points (chosen against the synthetic corpus quantiles:
# n_words median 56, top_frac median 0.11, dup_frac median 0.55 — each tier
# is non-trivially populated); must stay in sync with the SQL oracle CASE
TIER_LOW_WORDS = 25
TIER_LOW_DUP = 0.65
TIER_LOW_TOP = 0.14
TIER_HIGH_WORDS = 56
TIER_HIGH_DUP = 0.5
TIER_HIGH_TOP = 0.11


def quality_tier_batch(stats: pa.Table) -> pa.Table:
    """Quality-tier assignment over ``word_stats_batch`` output (the
    tier-extraction step of a webtext curation pipeline): 'low' fails any
    Gopher-ish floor, 'high' clears every ceiling, 'mid' otherwise.
    Pure ``pc.if_else`` chain — vectorized, mirrors the SQL CASE exactly
    (comparisons run on the 6-dp-rounded fractions both sides)."""
    nw, tf, df = stats["n_words"], stats["top_frac"], stats["dup_frac"]
    is_low = pc.or_(
        pc.or_(
            pc.less(nw, pa.scalar(TIER_LOW_WORDS, pa.int64())),
            pc.greater_equal(df, pa.scalar(TIER_LOW_DUP)),
        ),
        pc.greater_equal(tf, pa.scalar(TIER_LOW_TOP)),
    )
    is_high = pc.and_(
        pc.and_(
            pc.greater_equal(nw, pa.scalar(TIER_HIGH_WORDS, pa.int64())),
            pc.less(df, pa.scalar(TIER_HIGH_DUP)),
        ),
        pc.less(tf, pa.scalar(TIER_HIGH_TOP)),
    )
    tier = pc.if_else(
        is_low,
        pa.scalar("low"),
        pc.if_else(is_high, pa.scalar("high"), pa.scalar("mid")),
    )
    return pa.table(
        {
            "doc_id": stats["doc_id"],
            "tier": tier,
            "n_words": stats["n_words"],
            "top_frac": stats["top_frac"],
            "dup_frac": stats["dup_frac"],
        }
    )


def tier_gate_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality gate for the training-set build: drop 'low'-tier docs
    (and no-word docs), carry text + exact-dedup key forward. One
    stateless kernel = word stats -> tier -> filter -> md5."""
    stats = word_stats_batch(batch, col)
    tiers = quality_tier_batch(stats)
    keep_ids = {
        did
        for did, t in zip(
            tiers["doc_id"].to_pylist(), tiers["tier"].to_pylist()
        )
        if t != "low"
    }
    mask = [did in keep_ids for did in batch["doc_id"].to_pylist()]
    t = batch.filter(pa.array(mask, pa.bool_()))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            col: t[col],
            "content_md5": md5_hex_array(t[col].to_pylist()),
        }
    )


def word_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition features per document: word count,
    distinct-word count, most-frequent word (ties -> lexicographically
    smallest) and its frequency fraction, duplicate-word fraction.
    Tokenization = split on single spaces, empty tokens dropped —
    mirrored exactly by the SQL oracle's
    ``unnest(string_split(text, ' ')) ... where w <> ''``. Docs with no
    words are dropped (same as the oracle). The per-row Counter loop is
    inherent tokenize work (same shape as ``token_count_batch``)."""
    from collections import Counter

    ids_out, nw_out, nd_out, tw_out, tf_out, df_out = [], [], [], [], [], []
    for did, t in zip(batch["doc_id"].to_pylist(), batch[col].to_pylist()):
        words = [w for w in (t or "").split(" ") if w]
        if not words:
            continue
        c = Counter(words)
        n_words = len(words)
        top_word, top_c = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        ids_out.append(did)
        nw_out.append(n_words)
        nd_out.append(len(c))
        tw_out.append(top_word)
        tf_out.append(round(top_c / n_words, 6))
        df_out.append(round((n_words - len(c)) / n_words, 6))
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "n_words": pa.array(nw_out, pa.int64()),
            "n_distinct": pa.array(nd_out, pa.int64()),
            "top_word": pa.array(tw_out, pa.string()),
            "top_frac": pa.array(tf_out, pa.float64()),
            "dup_frac": pa.array(df_out, pa.float64()),
        }
    )


def repetition_signals_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1) — the standard
    web-curation gate alongside ``word_stats_batch``'s word-level fracs:

    - ``dup_line_frac``       duplicate lines / total lines (count basis)
    - ``dup_line_char_frac``  chars inside repeat line occurrences / all
                              line chars (a 1000-copy boilerplate line
                              weighs by its length, not just its count)
    - ``top_bigram_frac`` / ``top_trigram_frac``   occurrences of the most
                              frequent word {2,3}-gram / total {2,3}-grams
    - ``dup_bigram_frac`` / ``dup_trigram_frac``   n-gram occurrences
                              beyond each gram's first / total {2,3}-grams

    Conventions shared with the SQL oracle: words = split on single
    spaces, empty tokens dropped; lines = split on ``\\n``, empty lines
    dropped; docs with no words are dropped entirely; signals whose
    denominator is empty (no lines / <2 words / <3 words) emit 0.0; all
    fractions rounded to 6 dp so both sides hash identically.
    Embarrassingly parallel — no shuffle, no state; the per-row Counter
    loop is inherent tokenize work (same shape as ``word_stats_batch``)."""
    from collections import Counter

    ids, nl_out, dlf, dlcf, tbf, dbf, ttf, dtf = ([] for _ in range(8))

    def _top_dup(grams: list) -> tuple[float, float]:
        if not grams:
            return 0.0, 0.0
        c = Counter(grams)
        n = len(grams)
        return (
            round(max(c.values()) / n, 6),
            round((n - len(c)) / n, 6),
        )

    for did, t in zip(batch["doc_id"].to_pylist(), batch[col].to_pylist()):
        words = [w for w in (t or "").split(" ") if w]
        if not words:
            continue
        lines = [ln for ln in (t or "").split("\n") if ln]
        if lines:
            lc = Counter(lines)
            n_lines = len(lines)
            total_ch = sum(len(ln) for ln in lines)
            rep_ch = sum(len(ln) * (c - 1) for ln, c in lc.items())
            dup_line = round((n_lines - len(lc)) / n_lines, 6)
            dup_line_ch = round(rep_ch / total_ch, 6)
        else:  # text made solely of newlines still tokenizes to a word
            n_lines, dup_line, dup_line_ch = 0, 0.0, 0.0
        top_bg, dup_bg = _top_dup(
            [f"{a} {b}" for a, b in zip(words, words[1:])]
        )
        top_tg, dup_tg = _top_dup(
            [f"{a} {b} {c}" for a, b, c in zip(words, words[1:], words[2:])]
        )
        ids.append(did)
        nl_out.append(n_lines)
        dlf.append(dup_line)
        dlcf.append(dup_line_ch)
        tbf.append(top_bg)
        dbf.append(dup_bg)
        ttf.append(top_tg)
        dtf.append(dup_tg)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_lines": pa.array(nl_out, pa.int64()),
            "dup_line_frac": pa.array(dlf, pa.float64()),
            "dup_line_char_frac": pa.array(dlcf, pa.float64()),
            "top_bigram_frac": pa.array(tbf, pa.float64()),
            "dup_bigram_frac": pa.array(dbf, pa.float64()),
            "top_trigram_frac": pa.array(ttf, pa.float64()),
            "dup_trigram_frac": pa.array(dtf, pa.float64()),
        }
    )


def word_count_partials(batch: pa.Table, col: str = "text") -> pa.Table:
    """Pass 1 of the unigram-LM quality score: PARTIAL word counts per
    batch (same combiner shape as ``line_count_partials`` — the shuffle
    moves (word, partial count) rows, never document text). Tokenization
    is the repo convention: split on single spaces, empty tokens dropped
    (mirrors the SQL oracle's ``unnest(string_split(text, ' '))
    ... where w <> ''``)."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch[col].to_pylist():
        c.update(w for w in (t or "").split(" ") if w)
    return pa.table(
        {
            "word": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


class LmScore:
    """Pass 2 of the unigram-LM quality score (the CCNet-style
    perplexity-proxy filter): a broadcast unigram model {word: corpus
    count} + total token count, shipped once per actor as plain
    constructor values (restart-safe, ray#53727). Per doc emits

        lm_bits = round(mean over tokens of log2(total / count(w)), 6)

    — the doc's average per-token code length under the corpus unigram
    distribution (lower = more typical text; boilerplate/keyboard-mash
    scores high). Words absent from a count-capped model fall back to
    ``oov_count`` (< 1, i.e. rarer than any seen word); with an uncapped
    model every token is in-vocabulary, which is what the SQL oracle
    replicates. Docs with no tokens are dropped (same as the oracle).
    The per-row token loop is inherent tokenize work; the log/mean math
    is vectorized numpy per document."""

    def __init__(self, model: dict, col: str = "text"):
        self.counts = model["counts"]
        self.total = float(model["total"])
        self.oov = float(model.get("oov", 0.5))
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, nt_out, bits_out = [], [], []
        get = self.counts.get
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch[self.col].to_pylist()
        ):
            words = [w for w in (t or "").split(" ") if w]
            if not words:
                continue
            cs = np.fromiter(
                (get(w, self.oov) for w in words),
                dtype=np.float64,
                count=len(words),
            )
            bits = float(np.log2(self.total / cs).sum()) / len(words)
            ids_out.append(did)
            nt_out.append(len(words))
            bits_out.append(round(bits, 6))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_tokens": pa.array(nt_out, pa.int64()),
                "lm_bits": pa.array(bits_out, pa.float64()),
            }
        )


# URL canonicalization (the Common-Crawl URL-level dedup pass). The
# tracking-parameter class and the rewrite CHAIN ORDER are shared
# verbatim with the SQL oracle — both engines run RE2-compatible global
# replaces, so the chain is engine-independent. Keys match
# case-insensitively and with or without a value ('?UTM_SOURCE=x' and
# bare '?utm_source' are both tracking noise).
URL_TRACKING = r"(?i:utm_[a-z_]+|fbclid|gclid)(=[^&]*)?"


def derive_url_batch(batch: pa.Table) -> pa.Table:
    """Deterministic URL synthesis for the url-dedup fixture (documents
    carry no URL column): five variant classes per doc_id — tracking
    params, fragment, uppercased scheme+host, explicit :443 port, plain
    ?id — that all collapse under canonicalization. This is test
    scaffolding (mirrored 1:1 by the oracle's CASE expression), not the
    operator; the operator is ``canonicalize_url_batch``."""
    urls = []
    for did, lang, src in zip(
        batch["doc_id"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["source"].to_pylist(),
    ):
        host = f"{src}.example.com"
        path = f"/{lang}/{did % 200}"
        v = did % 5
        if v == 0:
            u = f"https://{host}{path}?utm_source=feed&utm_campaign=x&id={did % 97}"
        elif v == 1:
            u = f"https://{host}{path}#section-2"
        elif v == 2:
            u = f"HTTPS://{host.upper()}{path}"
        elif v == 3:
            u = f"https://{host}:443{path}"
        else:
            u = f"https://{host}{path}?id={did % 97}"
        urls.append(u)
    return pa.table(
        {"doc_id": batch["doc_id"], "url": pa.array(urls, pa.string())}
    )


def canonicalize_url_batch(batch: pa.Table, col: str = "url") -> pa.Table:
    """Vectorized URL canonicalization: strip fragment, drop tracking
    query parameters (utm_*/fbclid/gclid) while keeping the rest, repair
    separators, lowercase scheme+host, drop an explicit :443 port. Every
    step is a pyarrow RE2 kernel over the whole batch — no per-row
    Python."""
    u = batch[col]
    u = pc.replace_substring_regex(u, pattern=r"#.*", replacement="")
    u = pc.replace_substring_regex(
        u, pattern=r"\?" + URL_TRACKING, replacement="?"
    )
    u = pc.replace_substring_regex(
        u, pattern=r"&" + URL_TRACKING, replacement=""
    )
    u = pc.replace_substring_regex(u, pattern=r"\?&", replacement="?")
    u = pc.replace_substring_regex(u, pattern=r"[?&]$", replacement="")
    parts = pc.extract_regex(
        u, pattern=r"^(?P<scheme>[^:]+)://(?P<host>[^/?#]*)(?P<rest>.*)$"
    )
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    # default ports are scheme-specific: :443 is only redundant under
    # https and :80 only under http (an http service on 443 is a
    # DIFFERENT resource and must not merge)
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, pattern=r":443$", replacement=""),
        host,
    )
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, pattern=r":80$", replacement=""),
        host,
    )
    rest = pc.struct_field(parts, "rest")
    canon = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "url": batch[col],
            "canon_url": canon,
        }
    )


def explode_words_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """(doc_id, word) row per token — the exploded form the exact
    (join-route) LM scorer shuffles on the word key. Same tokenization
    convention as ``word_count_partials``."""
    ids_out: list[int] = []
    words_out: list[str] = []
    for did, t in zip(batch["doc_id"].to_pylist(), batch[col].to_pylist()):
        ws = [w for w in (t or "").split(" ") if w]
        ids_out.extend([did] * len(ws))
        words_out.extend(ws)
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "word": pa.array(words_out, pa.string()),
        }
    )


def bigram_count_partials(batch: pa.Table, col: str = "text") -> pa.Table:
    """Pass 1 of the bigram-LM score: PARTIAL adjacent-pair counts per
    batch (combiner — the shuffle moves (w1, w2, count) rows, never
    text). Tokenization is the repo convention (single-space split,
    empties dropped); a doc with < 2 tokens contributes no bigrams."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch[col].to_pylist():
        ws = [w for w in (t or "").split(" ") if w]
        c.update(zip(ws, ws[1:]))
    k = list(c.keys())
    return pa.table(
        {
            "w1": pa.array([a for a, _ in k], pa.string()),
            "w2": pa.array([b for _, b in k], pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def explode_bigram_positions_batch(
    batch: pa.Table, col: str = "text"
) -> pa.Table:
    """One row per TOKEN POSITION for the exact (join-route) bigram
    scorer: ``w2`` is the token itself, ``w1`` its predecessor ("" for
    each doc's first token — scored unigram-only), ``bg`` the composite
    join key "w1 w2" (unambiguous: tokens contain no spaces). Shuffles
    carry only these short strings, never document text."""
    ids_out: list[int] = []
    w1_out: list[str] = []
    w2_out: list[str] = []
    for did, t in zip(batch["doc_id"].to_pylist(), batch[col].to_pylist()):
        ws = [w for w in (t or "").split(" ") if w]
        if not ws:
            continue
        ids_out.extend([did] * len(ws))
        w1_out.append("")
        w1_out.extend(ws[:-1])
        w2_out.extend(ws)
    bg = [f"{a} {b}" if a else "" for a, b in zip(w1_out, w2_out)]
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "w1": pa.array(w1_out, pa.string()),
            "w2": pa.array(w2_out, pa.string()),
            "bg": pa.array(bg, pa.string()),
        }
    )


class LmBigramScore:
    """Pass 2 of the interpolated bigram-LM score (the KenLM-style
    upgrade of ``LmScore``; CCNet filters on a 5-gram KenLM — a bigram
    with Jelinek–Mercer interpolation is the same shape one order up
    from the unigram proxy). Broadcast models shipped once per actor as
    plain constructor values (restart-safe, ray#53727):

    - position 1:  bits = log2(T / c(w))           (unigram, no context)
    - position i>1: bits = -log2(lam * cb(w1,w2)/cc(w1)
                             + (1-lam) * c(w2)/T)

    where cb = corpus bigram count, cc(w1) = count of bigrams starting
    with w1 (so cb/cc is a proper conditional), c = unigram count, T =
    total tokens. The model is fit on the same corpus, so every bigram
    and word of every doc is in-model — no OOV path (over-cap
    vocabularies route to the exact distributed-join scorer instead,
    same size-routing contract as ``q_lm_score``). Emits per doc the
    mean per-token code length ``lm2_bits`` rounded to 6 dp (the float
    reorder tolerance used by every float aggregate here)."""

    def __init__(self, model: dict, col: str = "text"):
        self.uni = model["uni"]
        self.big = model["big"]
        self.ctx = model["ctx"]
        self.total = float(model["total"])
        self.lam = float(model["lam"])
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        uni, big, ctx = self.uni, self.big, self.ctx
        T, lam, one_m = self.total, self.lam, 1.0 - float(self.lam)
        ids_out, nt_out, bits_out = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch[self.col].to_pylist()
        ):
            ws = [w for w in (t or "").split(" ") if w]
            if not ws:
                continue
            s = math.log2(T / uni[ws[0]])
            for a, b in zip(ws, ws[1:]):
                s += -math.log2(
                    lam * (big[(a, b)] / ctx[a]) + one_m * (uni[b] / T)
                )
            ids_out.append(did)
            nt_out.append(len(ws))
            bits_out.append(round(s / len(ws), 6))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_tokens": pa.array(nt_out, pa.int64()),
                "lm2_bits": pa.array(bits_out, pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# Readability (Flesch reading-ease family) — integer-exact so DuckDB can
# value-verify it. Definitions are shared verbatim with the oracle:
# words = '\S+' runs, sentences = '[.!?]+' runs, syllables = ASCII vowel
# groups '[aeiouyAEIOUY]+' (the standard cheap heuristic). The score is
# kept in milli-units with truncate-toward-zero division — DuckDB's `//`
# truncates toward zero while Python's `//` floors, so _tdiv mirrors SQL.

SENT_RE = re.compile(r"[.!?]+")
VOWEL_RE = re.compile(r"[aeiouyAEIOUY]+")
_WORD_RE = re.compile(TOKEN_PATTERN)


def _tdiv(num: int, den: int) -> int:
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den >= 0) else -q


def readability_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Per-doc Flesch reading-ease in milli-units:
    1000 * (206.835 - 1.015*(W/S) - 84.6*(Syl/W)) computed exactly as
    (206835*S*W - 1015*W*W - 84600*Syl*S) / (S*W) in integers, with W
    and S floored at 1 so empty docs stay defined."""
    n_words, n_sents, n_syl, flesch = [], [], [], []
    for t in batch[col].to_pylist():
        t = t or ""
        words = len(_WORD_RE.findall(t))
        sents = len(SENT_RE.findall(t))
        syl = sum(1 for _ in VOWEL_RE.finditer(t))
        w, s = max(words, 1), max(sents, 1)
        num = 206835 * s * w - 1015 * w * w - 84600 * syl * s
        n_words.append(words)
        n_sents.append(sents)
        n_syl.append(syl)
        flesch.append(_tdiv(num, s * w))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_sentences": pa.array(n_sents, pa.int64()),
            "n_syllables": pa.array(n_syl, pa.int64()),
            "flesch_milli": pa.array(flesch, pa.int64()),
        }
    )
