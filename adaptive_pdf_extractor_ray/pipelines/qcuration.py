"""Webtext curation: PII redaction, corpus line dedup, LM quality scoring, training-sequence chunks.

Split from the former monolithic queries.py (round-4 VERDICT item 2); the
public surface is re-exported unchanged by pipelines/queries.py.
"""

from __future__ import annotations
import hashlib
import json
import functools
import math
import os
import re
from collections import Counter
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ..functions.rules import Rule
from ..functions.textnorm import normalize_sql, normalize_text_array
from ..stages import dedup as dd
from ..stages import joins as sj
from ..stages import similarity as sim
from ..stages import text as tx
from ..stages.media import MediaDecoder

from .qhelpers import (  # noqa: F401
    _apool, _read, _table_rows,
)
from .qquality import (  # noqa: F401
    DECON_MAX_ID, DECON_MOD,
)
from .qgraph import (  # noqa: F401
    RANK_BUCKET,
)





def _pii_page(doc_id: int, text: str) -> str:
    """Deterministic PII-bearing page derived from a documents row (the
    raw text carries no addresses); the SQL oracle rebuilds it with the
    identical concatenation."""
    return (
        f"{text} contact user{doc_id}@mail{doc_id % 7}.com visit"
        f" http://site{doc_id % 13}.example/p{doc_id} call"
        f" 555-{doc_id % 10000:04d}"
    )


def q_pii_redact(sf_dir: str):
    """PII redaction (webtext publishing hygiene): count + mask URLs,
    emails and phone numbers with three vectorized RE2 kernels per batch
    (``pc.count_substring_regex`` / ``pc.replace_substring_regex``) in a
    fixed order — URL, email, phone — mirrored exactly by nested
    ``regexp_replace(..., 'g')`` in the oracle."""

    def derive(t: pa.Table) -> pa.Table:
        pages = [
            _pii_page(d, txt)
            for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(pages, pa.string())}
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(tx.pii_redact_batch, batch_format="pyarrow")
    )


LINE_MIN_DOCS = 5  # a line repeated across >= this many docs is boilerplate
# broadcast bound for the frequent-line set: a corpus where boilerplate
# variety itself scales (many templates × many sites) must not grow the
# broadcast without limit — over the cap, keep the most-repeated lines
# (the highest-impact boilerplate) and log the dropped volume
LINE_DROP_CAP = 200_000


def q_line_dedup(sf_dir: str):
    """Corpus-level duplicate-line removal (the CCNet / RefinedWeb
    boilerplate pass): pages derived from documents carry a per-source
    header and per-lang footer; pass 1 computes global line doc-frequency
    from per-batch PARTIAL counts keyed by md5 (the shuffle moves
    (hash, count) rows, never line text); the frequent set — bounded by
    construction, it's the boilerplate — is broadcast to a pass-2 actor
    pool that re-derives lines per doc and drops members. No doc text is
    ever shuffled."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    freq = (
        docs.map_batches(
            tx.line_count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("line_md5")
        .sum("nd")
    )

    def keep_frequent(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t["sum(nd)"], pa.scalar(LINE_MIN_DOCS, pa.int64()))
        )

    frequent = freq.map_batches(
        keep_frequent, batch_format="pyarrow"
    ).materialize()
    n_frequent = frequent.count()
    if n_frequent > LINE_DROP_CAP:
        # no-silent-caps: keep the most-repeated lines, say what was cut
        import logging

        logging.getLogger(__name__).warning(
            "line_dedup: %d frequent lines exceed the %d broadcast cap; "
            "keeping the top %d by doc frequency (%d dropped)",
            n_frequent, LINE_DROP_CAP, LINE_DROP_CAP,
            n_frequent - LINE_DROP_CAP,
        )
        from ..stages.topk import dataset_topk

        frequent = dataset_topk(
            frequent,
            [("sum(nd)", "descending"), ("line_md5", "ascending")],
            LINE_DROP_CAP,
        )
    drop = {r["line_md5"] for r in frequent.take_all()}
    return docs.map_batches(
        tx.LineDedup,
        fn_constructor_args=(drop,),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


DOMAIN_LINE_MIN = 3  # per-domain boilerplate needs >= this many docs...
DOMAIN_LINE_PCT = 30  # ...and >= this % of the domain's pages


def q_line_dedup_domain(sf_dir: str):
    """PER-DOMAIN boilerplate line removal (the RefinedWeb variant of
    `line_dedup`: a nav bar repeated across one site is boilerplate even
    if globally rare, while a sentence that recurs across unrelated
    sites is left alone). Pass 0 counts docs per domain (one tiny
    groupby); pass 1 computes per-(domain, line-hash) doc frequency from
    per-batch partials — the shuffle moves (source, hash, count) rows,
    never line text; the two are hash-joined on source and a line is
    boilerplate iff it appears in >= DOMAIN_LINE_MIN docs AND >=
    DOMAIN_LINE_PCT% of its domain's pages (integer cross-multiply, no
    float threshold). The frequent set is broadcast — bounded by
    per-domain boilerplate variety and capped like `line_dedup`; at
    10^12 pages × 10^8 domains the same plan swaps the broadcast for an
    exploded-lines ⋈ frequent-set hash join reassembled by
    groupby(doc_id) ordered on line_no (documented, not needed at any
    tested scale)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    ndocs = docs.groupby("source").aggregate(
        ray.data.aggregate.Count(alias_name="n_docs")
    )
    freq = (
        docs.map_batches(
            tx.domain_line_count_partials,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source", "line_md5"])
        .sum("nd")
    )
    j = sj.safe_join(
        freq, ndocs,
        join_type="inner",
        num_partitions=dd.adaptive_partitions(
            _table_rows(sf_dir, "documents")
        ),
        on=("source",),
    )

    def keep_frequent(t: pa.Table) -> pa.Table:
        nd = t["sum(nd)"]
        ok = pc.and_(
            pc.greater_equal(nd, pa.scalar(DOMAIN_LINE_MIN, pa.int64())),
            pc.greater_equal(
                pc.multiply(nd, pa.scalar(100, pa.int64())),
                pc.multiply(
                    t["n_docs"], pa.scalar(DOMAIN_LINE_PCT, pa.int64())
                ),
            ),
        )
        return t.filter(ok)

    frequent = j.map_batches(
        keep_frequent, batch_format="pyarrow"
    ).materialize()
    n_frequent = frequent.count()
    if n_frequent > LINE_DROP_CAP:
        import logging

        logging.getLogger(__name__).warning(
            "line_dedup_domain: %d frequent (domain, line) pairs exceed "
            "the %d broadcast cap; keeping the top %d by doc frequency "
            "(%d dropped)",
            n_frequent, LINE_DROP_CAP, LINE_DROP_CAP,
            n_frequent - LINE_DROP_CAP,
        )
        from ..stages.topk import dataset_topk

        frequent = dataset_topk(
            frequent,
            [
                ("sum(nd)", "descending"),
                ("source", "ascending"),
                ("line_md5", "ascending"),
            ],
            LINE_DROP_CAP,
        )
    drop = {
        (r["source"], r["line_md5"]) for r in frequent.take_all()
    }
    return docs.map_batches(
        tx.LineDedupDomain,
        fn_constructor_args=(drop,),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


def q_clean_c4(sf_dir: str):
    """C4-style page cleaning (Raffel et al. 2020 §2.2): line rules
    (terminal punctuation, >= 5 words, no 'javascript') and page rules
    (>= 3 surviving lines, no 'lorem ipsum', no '{') over deterministic
    noisy pages derived from documents. Embarrassingly parallel — one
    stateless vectorized-derivation map_batches, no shuffle at any
    scale; the filter drops rows inside the batch so dropped pages
    never reach the object store."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.c4_clean_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_url_dedup(sf_dir: str):
    """URL-level dedup with canonicalization (the Common-Crawl crawl-
    frontier dedup pass): derive the fixture URL per doc (deterministic
    variant classes — tracking params, fragments, case, :443 — mirrored
    by the oracle's CASE), canonicalize with vectorized RE2 kernels, and
    keep the minimum doc_id per canonical URL. One shuffle, keyed by the
    canonical URL string; at 10^12 pages the groupby key could be the
    md5 of the canonical form (16 bytes) with the same plan shape."""
    urls = (
        _read(sf_dir, "documents", ["doc_id", "lang", "source"])
        .map_batches(
            tx.derive_url_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(
            tx.canonicalize_url_batch,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return urls.groupby("canon_url").aggregate(
        ray.data.aggregate.Min("doc_id", alias_name="keep_doc_id"),
        ray.data.aggregate.Count(alias_name="n_variants"),
    )


LM_VOCAB_CAP = 500_000  # broadcast-model ceiling (words); see q_lm_score
LM_OOV_COUNT = 0.5  # pseudo-count for words cut by the cap


def q_lm_score(sf_dir: str):
    """Unigram-LM quality score (the CCNet-style perplexity-proxy
    filter): pass 1 fits the model — per-batch PARTIAL word counts
    (combiner; the shuffle moves (word, count) rows, never text) →
    groupby-sum; pass 2 scores each doc's mean per-token code length
    ``lm_bits = mean(log2(total / count(w)))``. Size-routed like the
    repo's joins: a vocabulary within LM_VOCAB_CAP broadcasts the model
    to a stateless actor-pool map (one pass over the docs, no further
    shuffle); an open-web vocabulary over the cap switches to the EXACT
    distributed-join route — explode (doc_id, word), hash-join the
    counts on word, groupby doc_id — value-identical to the broadcast
    route (equivalence pytest) and to the SQL oracle, at the cost of
    two corpus×token-sized shuffles. No approximation either way."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = (
        docs.map_batches(
            tx.word_count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("word")
        .sum("n")
        .materialize()
    )
    total = counts.sum("sum(n)") or 0
    n_vocab = counts.count()
    if n_vocab > LM_VOCAB_CAP:
        import logging

        logging.getLogger(__name__).info(
            "lm_score: vocabulary of %d words exceeds the %d broadcast "
            "cap; routing to the exact distributed-join scorer", n_vocab,
            LM_VOCAB_CAP,
        )
        return _lm_score_join(docs, counts, total)
    model = {r["word"]: r["sum(n)"] for r in counts.take_all()}
    return docs.map_batches(
        tx.LmScore,
        fn_constructor_args=(
            {"counts": model, "total": total, "oov": LM_OOV_COUNT},
        ),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


def _lm_score_join(docs, counts, total: int):
    """Exact LM scoring without a broadcast model: one shuffle keyed by
    word (hash join token rows to their corpus counts), one keyed by
    doc_id (fold per-token code lengths into the per-doc mean). The
    cross-block float Sum reorders additions; the 6-dp round absorbs
    that (~1e-13), same stance as every other float aggregate here."""
    from ..stages.dedup import adaptive_partitions

    tok = docs.map_batches(
        tx.explode_words_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    cj = counts.map_batches(
        lambda t: pa.table({"word": t["word"], "c": t["sum(n)"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = sj.safe_join(
        tok, cj, join_type="inner", on=("word",),
        num_partitions=adaptive_partitions(int(total)),
    )

    def bits(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bits": pa.array(np.log2(float(total) / c), pa.float64()),
            }
        )

    agg = (
        joined.map_batches(bits, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Sum("bits", alias_name="s"),
            ray.data.aggregate.Count(alias_name="n_tokens"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_tokens"], pa.int64())
        s = np.asarray(t["s"].to_pylist(), dtype=np.float64)
        nv = np.asarray(n.to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n,
                "lm_bits": pa.array(np.round(s / nv, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


LM_LAMBDA = 0.7  # Jelinek–Mercer interpolation weight on the bigram term
LM_BIGRAM_CAP = 2_000_000  # broadcast-model ceiling (distinct bigrams)


def q_lm_bigram(sf_dir: str):
    """Interpolated bigram-LM quality score — the KenLM-style upgrade of
    ``lm_score`` (CCNet's actual filter is a 5-gram KenLM; this is the
    same conditional-probability shape one order up from the unigram
    proxy, with Jelinek–Mercer smoothing against the unigram floor).
    Fit: two partial-count combiners (unigrams and adjacent pairs) →
    groupby-sum — the shuffles move (word, n) / (w1, w2, n) rows, never
    text. Score: position 1 is unigram-coded, position i>1 costs
    ``-log2(lam·cb/cc + (1-lam)·c/T)``. Size-routed exactly like
    ``q_lm_score``: within-cap models broadcast to an autoscaling actor
    pool (one pass, no further shuffle); over-cap vocabularies switch to
    the EXACT distributed-join route (explode token positions, join
    counts on the composite bigram key, groupby doc_id) —
    value-identical by equivalence test. No approximation either way."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    uni = (
        docs.map_batches(
            tx.word_count_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("word")
        .sum("n")
        .materialize()
    )
    total = uni.sum("sum(n)") or 0
    big = (
        docs.map_batches(
            tx.bigram_count_partials, batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["w1", "w2"])
        .sum("n")
        .materialize()
    )
    if uni.count() > LM_VOCAB_CAP or big.count() > LM_BIGRAM_CAP:
        import logging

        logging.getLogger(__name__).info(
            "lm_bigram: model over the broadcast cap; routing to the "
            "exact distributed-join scorer"
        )
        return _lm_bigram_join(docs, uni, big, total)
    uni_m = {r["word"]: r["sum(n)"] for r in uni.take_all()}
    big_m: dict[tuple[str, str], int] = {}
    ctx_m: dict[str, int] = {}
    for r in big.take_all():
        big_m[(r["w1"], r["w2"])] = r["sum(n)"]
        ctx_m[r["w1"]] = ctx_m.get(r["w1"], 0) + r["sum(n)"]
    return docs.map_batches(
        tx.LmBigramScore,
        fn_constructor_args=(
            {
                "uni": uni_m,
                "big": big_m,
                "ctx": ctx_m,
                "total": total,
                "lam": LM_LAMBDA,
            },
        ),
        batch_format="pyarrow",
        concurrency=_apool(),
        zero_copy_batch=True,
    )


def _lm_bigram_join(docs, uni, big, total: int):
    """Exact bigram scoring without a broadcast model: token positions
    explode to (doc_id, w1, w2, bg) rows; first-token rows (w1 = "",
    unigram-coded — no context) take the short path of ONE join against
    the unigram counts, the rest take three hash joins — bigram counts
    on the composite ``bg`` key, context counts on ``w1``, unigram
    counts on ``w2`` — and both bit streams union into one groupby
    doc_id fold. Shuffle volume is O(corpus tokens) of short strings;
    the 6-dp round absorbs cross-block float Sum reorder, same stance
    as ``_lm_score_join``."""
    from ..stages.dedup import adaptive_partitions

    nparts = adaptive_partitions(int(total))
    tok = docs.map_batches(
        tx.explode_bigram_positions_batch, batch_format="pyarrow",
        zero_copy_batch=True,
    )
    firsts = tok.filter(expr="w1 == ''")
    rest = tok.filter(expr="w1 != ''")
    bg_cnt = big.map_batches(
        lambda t: pa.table(
            {
                "bg": pc.binary_join_element_wise(
                    pc.cast(t["w1"], pa.string()),
                    pc.cast(t["w2"], pa.string()),
                    " ",
                ),
                "cb": t["sum(n)"],
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ctx_cnt = big.groupby("w1").sum("sum(n)").map_batches(
        lambda t: pa.table({"w1": t["w1"], "cc": t["sum(sum(n))"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    uni_cnt = uni.map_batches(
        lambda t: pa.table({"w2": t["word"], "c": t["sum(n)"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = sj.safe_join(
        sj.safe_join(
            sj.safe_join(rest, bg_cnt, join_type="inner", on=("bg",),
                         num_partitions=nparts),
            ctx_cnt, join_type="inner", on=("w1",),
            num_partitions=nparts),
        uni_cnt, join_type="inner", on=("w2",),
        num_partitions=nparts)
    jf = sj.safe_join(firsts, uni_cnt, join_type="inner", on=("w2",),
                      num_partitions=nparts)
    T = float(total)
    lam, one_m = float(LM_LAMBDA), 1.0 - float(LM_LAMBDA)

    def bits(t: pa.Table) -> pa.Table:
        cb = np.asarray(t["cb"].to_pylist(), dtype=np.float64)
        cc = np.asarray(t["cc"].to_pylist(), dtype=np.float64)
        c = np.asarray(t["c"].to_pylist(), dtype=np.float64)
        b = -np.log2(lam * (cb / cc) + one_m * (c / T))
        return pa.table(
            {"doc_id": t["doc_id"], "bits": pa.array(b, pa.float64())}
        )

    def bits_first(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bits": pa.array(np.log2(T / c), pa.float64()),
            }
        )

    agg = (
        j.map_batches(bits, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            jf.map_batches(
                bits_first, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Sum("bits", alias_name="s"),
            ray.data.aggregate.Count(alias_name="n_tokens"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_tokens"], pa.int64())
        s = np.asarray(t["s"].to_pylist(), dtype=np.float64)
        nv = np.asarray(n.to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n,
                "lm2_bits": pa.array(np.round(s / nv, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def q_chunk_windows(sf_dir: str):
    """Training-sequence chunking: overlapping fixed-size token windows
    (32-token window, 24-token stride) per document — embarrassingly
    parallel flat expansion, no shuffle."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.chunk_windows_batch, batch_format="pyarrow", zero_copy_batch=True
    )


PACK_BUDGET = 512  # tokens per packed training sequence


def q_pack_sequences(sf_dir: str):
    """Deterministic contiguous sequence packing (doc -> fixed-token-
    budget training sequence, in doc_id order) WITHOUT a global sort: a
    distributed prefix sum. Per-doc token counts carry a bounded
    (doc_id // RANK_BUCKET) bucket key; one small groupby sums tokens per
    bucket, the driver cumsums the bucket table (buckets ≪ rows) into
    broadcast base offsets, and each bucket group enumerates its local
    cumsum on top of its base — the same bounded-group decomposition as
    q_global_rank / the bucketed event trio."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tokc(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(t["text"], pattern="[^ ]+"), pa.int64()
        )
        b = pc.cast(
            pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64())),
            pa.int64(),
        )
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n, "bucket": b})

    wt = docs.map_batches(tokc, batch_format="pyarrow", zero_copy_batch=True)
    sums = wt.groupby("bucket").sum("n_tokens").take_all()
    base: dict[int, int] = {}
    cum = 0
    for r in sorted(sums, key=lambda r: r["bucket"]):
        base[r["bucket"]] = cum
        cum += r["sum(n_tokens)"]
    bref = ray.put(base)

    def pack_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        n = np.asarray(g["n_tokens"], dtype=np.int64)
        start = offsets[g["bucket"][0].as_py()] + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "start_tok": pa.array(start, pa.int64()),
                "seq_id": pa.array(start // PACK_BUDGET, pa.int64()),
            }
        )

    return wt.groupby("bucket").map_groups(pack_group, batch_format="pyarrow")


BIGRAM_K = 30


def q_bigram_topk(sf_dir: str):
    """Corpus bigram vocabulary: per-batch partial adjacent-pair counts
    (combiner) -> grouped Sum -> exact global top-K via per-block
    partial top-K (stages.topk), deterministic (n desc, bigram asc)
    tie-break."""
    from ..stages.topk import dataset_topk

    agg = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(
            tx.bigram_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bigram")
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )
    return dataset_topk(
        agg, [("n", "descending"), ("bigram", "ascending")], BIGRAM_K
    )


def q_quality_tiers(sf_dir: str):
    """Tier extraction: route every document into a quality tier
    (high / mid / low) from its Gopher-style repetition features — two
    stateless vectorized stages, no shuffle. Thresholds live in
    stages.text (TIER_*), mirrored by the oracle's CASE."""
    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            tx.word_stats_batch, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(tx.quality_tier_batch, batch_format="pyarrow")
    )


def q_domain_stats(sf_dir: str):
    """Per-(source, lang) corpus accounting — the crawl-domain rollup of
    a webtext pipeline: one groupby over two low-cardinality keys; the
    mean is derived from (sum, count) after the aggregate so rounding is
    controlled on both sides."""
    agg = (
        _read(sf_dir, "documents", ["source", "lang", "n_chars"])
        .groupby(["source", "lang"])
        .aggregate(
            ray.data.aggregate.Count(alias_name="n_docs"),
            ray.data.aggregate.Sum("n_chars", alias_name="total_chars"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.round(
            pc.divide(
                pc.cast(t["total_chars"], pa.float64()),
                pc.cast(t["n_docs"], pa.float64()),
            ),
            ndigits=6,
        )
        return pa.table(
            {
                "source": t["source"],
                "lang": t["lang"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "total_chars": pc.cast(t["total_chars"], pa.int64()),
                "avg_chars": avg,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _bench_grams(sf_dir: str) -> list[str]:
    """Distinct word n-grams of the benchmark docs (same bounded
    doc_id % DECON_MOD derivation as `_decon_phrases`), sorted for
    determinism. Bounded by the benchmark size, never the corpus."""
    src = _read(sf_dir, "documents", ["doc_id", "text"])

    def grams(t: pa.Table) -> pa.Table:
        m = pa.scalar(DECON_MOD, pa.int64())
        mod = pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], m), m)
        )
        keep = pc.and_(
            pc.equal(mod, pa.scalar(0, pa.int64())),
            pc.less(t["doc_id"], pa.scalar(DECON_MAX_ID, pa.int64())),
        )
        t = t.filter(keep)
        out: set[str] = set()
        for txt in t["text"].to_pylist():
            out |= tx.doc_ngrams(txt)
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    rows = src.map_batches(grams, batch_format="pyarrow").take_all()
    return sorted({r["g"] for r in rows})


def q_decontaminate_ngram(sf_dir: str):
    """n-gram-overlap decontamination (the GPT-3 / Pile method): flag
    every doc sharing any word 8-gram with the benchmark docs. The
    bounded benchmark gram set broadcasts to an autoscaling actor pool;
    membership is a per-doc set intersection — no shuffle at all."""
    grams = _bench_grams(sf_dir)
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tx.NgramDecontaminate, fn_constructor_args=(grams,),
        batch_format="pyarrow", concurrency=_apool(), zero_copy_batch=True,
    )


def q_dedup_substring(sf_dir: str):
    """Repeated-substring removal across the corpus — the practical
    distributed shape of exact-substring training-data dedup (Lee et al.
    2022, arXiv:2107.06499; the suffix-array global scan becomes
    stride-aligned 16-token windows): window occurrences hash-shuffle
    once to find windows shared by >= 2 distinct docs, the survivors'
    (doc_id, start) marks groupby to one row per affected doc, a hash
    LEFT join attaches the marks to the docs (unaffected docs pass
    through whole), and a stateless map rebuilds each text with covered
    tokens removed. No broadcast, no driver state; every shuffle is
    O(windows) or O(true duplication volume)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    nparts = dd.adaptive_partitions(_table_rows(sf_dir, "documents"))
    occ = docs.map_batches(
        tx.substr_window_marks, batch_format="pyarrow", zero_copy_batch=True
    )
    # shared iff the window's occurrences span >= 2 distinct docs —
    # detected with a streaming Min/Max aggregate (min(doc_id) !=
    # max(doc_id)), NOT a per-hash map_groups: a boilerplate window
    # present in every doc would otherwise put O(corpus) rows in one
    # group/task. The survivors join back to occurrences hash-partitioned.
    shared = (
        occ.groupby("h")
        .aggregate(
            ray.data.aggregate.Min("doc_id", alias_name="lo"),
            ray.data.aggregate.Max("doc_id", alias_name="hi"),
        )
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["lo"], t["hi"])).select(["h"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    marks = (
        sj.safe_join(occ, shared, join_type="inner",
                     num_partitions=nparts, on=("h",))
        .groupby("doc_id")
        .map_groups(tx.covered_positions_group, batch_format="pyarrow")
    )
    joined = sj.safe_join(
        docs, marks, join_type="left_outer", num_partitions=nparts,
        on=("doc_id",),
    )
    return joined.map_batches(tx.rebuild_dedup_batch, batch_format="pyarrow")


def q_build_training_set(sf_dir: str):
    """The end-to-end webtext -> training-sequences composition, as ONE
    dataflow: quality-tier gate (drop 'low') -> exact dedup keep-first
    (groupby content hash, min doc_id wins) -> 32-token chunking ->
    contiguous packing into 512-token sequences via the bucketed
    distributed prefix sum. Every stage is an operator verified on its
    own elsewhere; this query value-verifies their composition."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = docs.map_batches(
        tx.tier_gate_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def keep_first(g: pa.Table) -> pa.Table:
        i = pc.index(g["doc_id"], pc.min(g["doc_id"]).as_py()).as_py()
        return g.slice(i, 1).select(["doc_id", "text"])

    uniq = kept.groupby("content_md5").map_groups(
        keep_first, batch_format="pyarrow"
    )
    chunks = uniq.map_batches(
        tx.chunk_windows_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "chunk_id", "n_tokens"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64())),
            pa.int64(),
        )
        return t.append_column("bucket", b)

    wt = chunks.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    sums = wt.groupby("bucket").sum("n_tokens").take_all()
    base: dict[int, int] = {}
    cum = 0
    for r in sorted(sums, key=lambda r: r["bucket"]):
        base[r["bucket"]] = cum
        cum += r["sum(n_tokens)"]
    bref = ray.put(base)

    def pack_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[("doc_id", "ascending"),
                              ("chunk_id", "ascending")]
            )
        )
        n = np.asarray(g["n_tokens"], dtype=np.int64)
        start = offsets[g["bucket"][0].as_py()] + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "chunk_id": g["chunk_id"],
                "n_tokens": g["n_tokens"],
                "start_tok": pa.array(start, pa.int64()),
                "seq_id": pa.array(start // PACK_BUDGET, pa.int64()),
            }
        )

    return wt.groupby("bucket").map_groups(pack_group, batch_format="pyarrow")


MIX_SCALE = 1_000_000  # keep-rate resolution (parts per million)


def q_mix_rebalance(sf_dir: str):
    """Data-dependent corpus mixing (the rebalancing step of a
    pretraining data recipe): one tiny groupby counts docs per lang, the
    driver derives keep_rate(lang) = floor(1e6 * min_count / count) —
    downsample every language to the minority's share — and a broadcast
    rate table drives the same deterministic md5(doc_id)-keyed keep rule
    as `sample_stratified`. Aggregate -> broadcast -> stateless filter;
    the only shuffle is over (lang, count) rows."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    counts = ds.groupby("lang").aggregate(
        ray.data.aggregate.Count(alias_name="n")
    ).take_all()
    cmin = min(r["n"] for r in counts)
    rates = {r["lang"]: (MIX_SCALE * cmin) // r["n"] for r in counts}
    rref = ray.put(rates)

    def keep(t: pa.Table) -> pa.Table:
        rt = ray.get(rref)
        ids = t["doc_id"].to_pylist()
        langs = t["lang"].to_pylist()
        mask = [
            int.from_bytes(_hl.md5(str(i).encode()).digest()[:4], "big")
            % MIX_SCALE < rt[lang]
            for i, lang in zip(ids, langs)
        ]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)



SPLIT_BUCKETS = 100
SPLIT_TRAIN = 80  # buckets [0,80) -> train
