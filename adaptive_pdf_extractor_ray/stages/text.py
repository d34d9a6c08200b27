"""Text-analysis stages for large-scale training-data pipelines.

All operate on a string column via vectorized ``map_batches`` (pyarrow /
numpy kernels); each has an exactly-mirroring DuckDB SQL oracle in
``__ray_entry__.oracle_sql`` so the driver can verify value parity.
"""

from __future__ import annotations

import hashlib

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
    return int(h.min())


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
