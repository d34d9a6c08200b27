"""Outer join, pattern mining, sampled quantiles, record linkage, document structure (session 22).

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
    _apool, _lev_bytes, _read, _table_rows,
)
from .qtext import (  # noqa: F401
    q_doc_fingerprint, q_fingerprint, q_lang_id, q_normalize,
    q_pages_roundtrip, q_quality, q_rule_extract, q_token_count,
)
from .qdedup import (  # noqa: F401
    _lsh_distinct_pairs, q_cdc_dedup, q_decontaminate_semantic, q_dedup_containment,
    q_dedup_editdist, q_dedup_exact, q_dedup_jaccard, q_dedup_keep_best,
    q_dedup_minhash, q_dedup_minhash_clusters, q_dedup_minhash_est, q_dedup_simhash,
    q_embed_project, q_embed_quantize, q_embedding_neardup, q_inverted_index,
    q_ngram_novelty, q_setsim_join, q_syndication_pairs, q_tfidf_top_terms,
)
from .qsimilarity import (  # noqa: F401
    _query_vectors, q_agg_lineitem, q_coverage_sample, q_dedup_semantic,
    q_embed_matryoshka, q_embed_pq, q_kcenter_sample, q_knn_brute,
    q_knn_graph, q_knn_ivf, q_knn_lsh,
)
from .qrelational import (  # noqa: F401
    JOIN_BUCKETS, q_approx_distinct, q_asof_join, q_asof_join_bucketed,
    q_distinct_events, q_event_lag, q_event_lag_bucketed, q_heavy_hitters,
    q_join_bucketed, q_join_large, q_join_revenue, q_media_meta,
    q_multihop_join, q_sessionize, q_sessionize_bucketed, q_skew_f2,
    q_sliding_window, q_topk_orders, q_window_hourly,
)
from .qmedia import (  # noqa: F401
    q_curate, q_curate_neardup, q_media_frames, q_sample_stratified,
    q_sample_systematic, q_top_terms,
)
from .qflagship import (  # noqa: F401
    q_extract_grid_cards, q_extract_synthetic,
)
from .qquality import (  # noqa: F401
    LINK_N, PR_ITERS, q_decontaminate, q_domain_quota,
    q_repetition_signals, q_word_stats,
)
from .qgraph import (  # noqa: F401
    PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE, RANK_BUCKET,
    _grouped_sum_str, _outlinks_ds, link_corpus, q_anchor_text,
    q_char_entropy, q_domain_reputation, q_external_link_ratio, q_global_rank,
    q_html_meta, q_jsonl_roundtrip, q_label_centroids, q_lang_id_multi,
    q_length_quantiles, q_link_distance, q_link_indegree, q_link_kcore,
    q_media_phash_pairs, q_outlinks, q_pagerank, q_reciprocal_links,
    q_robots_filter, q_snapshot_diff, q_snapshot_incremental, q_snapshot_latest,
    q_temporal_novelty, q_tfidf_cosine_pairs, q_trustrank, q_url_filter,
)
from .qcuration import (  # noqa: F401
    q_bigram_topk, q_build_training_set, q_chunk_windows, q_clean_c4,
    q_decontaminate_ngram, q_dedup_substring, q_domain_stats, q_line_dedup,
    q_line_dedup_domain, q_lm_bigram, q_lm_score, q_mix_rebalance,
    q_pack_sequences, q_pii_redact, q_quality_tiers, q_url_dedup,
)
from .qtraining import (  # noqa: F401
    BM25_TOPK, q_bm25_search, q_crawl_frontier, q_dsir_weights,
    q_embedding_outliers, q_split_assign, q_top_terms_by_lang,
)
from .qwarc import (  # noqa: F401
    q_bloom_dedup, q_bpe_encode, q_bpe_pairs, q_bpe_train,
    q_ccnet_buckets, q_cdx_index, q_warc_fetch, q_warc_roundtrip,
)
from .qanalytics import (  # noqa: F401
    _simhash_band_pairs, q_ann_recall, q_approx_distinct_hll, q_cluster_sample,
    q_cocitation, q_cohort_retention, q_collocations, q_dau,
    q_decayed_counts, q_dedup_cross_corpus, q_dedup_eval_exact, q_dedup_eval_lsh,
    q_dedup_prefix, q_dedup_simhash_clusters, q_dedup_simhash_pairs, q_dedup_threshold_sweep,
    q_degree_distribution, q_dom_templates, q_domain_dup_stats, q_dup_cluster_sizes,
    q_event_transitions, q_filter_agreement, q_funnel, q_global_quantiles,
    q_graph_triangles, q_hapax_rate, q_hash_features, q_hits_rank,
    q_join_skewed, q_key_skew, q_kmeans, q_label_prop,
    q_late_events, q_lexical_diversity, q_link_components, q_mirror_domains,
    q_mojibake, q_orders_without_lineitems, q_phrase_search, q_pivot_events,
    q_posting_gaps, q_quality_logit, q_quantiles_by_domain, q_range_join,
    q_range_join_bucketed, q_readability, q_redirects, q_rollup_source_lang,
    q_running_total, q_sample_reservoir, q_sample_weighted, q_sample_weighted_stratified,
    q_scd2_intervals, q_script_mix, q_session_stats, q_split_token_budget,
    q_tokenizer_fertility, q_top_docs_per_source, q_topic_tag, q_url_history,
    q_url_templates, q_user_rfm, q_vocab_coverage, q_winsorize,
    q_xlang_mine,
)
from .qglobalstats import (  # noqa: F401
    q_ab_lift, q_agg_incremental, q_attribution_delay, q_audience_overlap,
    q_copy_search, q_corpus_kl, q_crawl_budget, q_csv_roundtrip,
    q_dedup_funnel, q_dedup_phash_clusters, q_domain_entropy, q_domain_gini,
    q_domain_similarity, q_embed_covariance, q_embed_pca, q_embed_standardize,
    q_event_anomaly, q_event_burstiness, q_event_cusum, q_event_entropy,
    q_event_gaps_hist, q_event_stationary, q_first_seen, q_graph_assortativity,
    q_join_storage_bucketed, q_k_anonymity, q_l_diversity, q_lang_confusion,
    q_length_lognormal, q_markov_perplexity, q_monthly_growth, q_profile_table,
    q_rowgroup_prune, q_session_paths, q_signal_correlation, q_snapshot_editdist,
    q_user_features, q_user_survival, q_weekday_seasonality, q_zipf_slope,
)
from .qpii import (  # noqa: F401
    q_bitext_mine, q_leakage_free_split, q_pii_gate, q_pii_scan,
    q_pii_scrub,
)
from .qsnapshot import (  # noqa: F401
    q_build_postings, q_crawl_schedule, q_join_outer, q_link_density,
    q_quality_composite, q_snapshot_asof,
)



JOIN_OUTER_SQL = """
with e as (
  select user_id as key, count(*)::bigint as n_events
  from events group by 1),
o as (
  select o_custkey as key, count(*)::bigint as n_orders,
         sum(o_totalprice) as total_price
  from orders group by 1)
select coalesce(e.key, o.key) as key,
       coalesce(e.n_events, 0)::bigint as n_events,
       coalesce(o.n_orders, 0)::bigint as n_orders,
       round(coalesce(o.total_price, 0.0), 2) as total_price,
       case when e.key is not null and o.key is not null then 'both'
            when e.key is null then 'orders_only'
            else 'events_only' end as side
from e full outer join o on e.key = o.key
"""


# minimum co-occurrence count for a part pair to be a frequent itemset
FREQ_MIN_SUPPORT = 3
# power-of-two bucket count for the itemset self-join (same role as
# JOIN_BUCKETS in q_join_bucketed)
FREQ_BUCKETS = 64


def q_freq_itemsets(sf_dir: str):
    """Frequent 2-itemset mining (co-purchased part pairs with support
    >= FREQ_MIN_SUPPORT) — the market-basket / co-occurrence primitive
    (Apriori's first real level). Pair generation is a bucketed SELF-join
    on the basket key: lineitems co-locate by hash(orderkey) % B, each
    bucket self-merges vectorized in pandas (fan-out bounded by the
    per-order line cap, so a bucket's pair count is ~linear in its
    rows), dedups (order, a, b), and pre-counts pairs LOCALLY — the
    combiner — so the global groupby((a, b)).Sum shuffles one row per
    distinct pair per bucket, never the pair instances. Skewed baskets
    (one order with 10^5 items) would need the same star-collapse cap
    the LSH bucket pairing uses; TPC-H baskets are bounded by
    construction."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def tag(t: pa.Table) -> pa.Table:
        b = pc.bit_wise_and(t["l_orderkey"], FREQ_BUCKETS - 1)
        return pa.table(
            {
                "bucket": pc.cast(b, pa.int64()),
                "okey": pc.cast(t["l_orderkey"], pa.int64()),
                "part": pc.cast(t["l_partkey"], pa.int64()),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="okey")
        m = m[m["part_x"] < m["part_y"]]
        if m.empty:
            return pd.DataFrame(
                {"part_a": pd.Series([], dtype="int64"),
                 "part_b": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        m = m.drop_duplicates(["okey", "part_x", "part_y"])
        out = (
            m.groupby(["part_x", "part_y"], as_index=False)
            .size()
            .rename(columns={"part_x": "part_a", "part_y": "part_b",
                             "size": "n"})
        )
        return out

    partials = (
        li.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    # final pair-count reduce via salted partitions + Arrow C++ group_by
    # (the _grouped_sum_str shape for an INT-PAIR key):
    # Dataset.groupby().aggregate(Sum) combines at Python speed and took
    # 170 s on the ~2M sf0.1 partial pair rows; this pass takes ~2 s.
    n_parts = 64

    def salt(t: pa.Table) -> pa.Table:
        a = pc.cast(t["part_a"], pa.int64())
        p = pc.bit_wise_and(
            pc.add(pc.multiply(a, 2654435761), t["part_b"]), n_parts - 1
        )
        return t.append_column("p", pc.cast(p, pa.int64()))

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:  # empty salt partition: keep the schema typed
            return pa.table(
                {
                    "part_a": pa.array([], pa.int64()),
                    "part_b": pa.array([], pa.int64()),
                    "support": pa.array([], pa.int64()),
                }
            )
        r = (
            g.select(["part_a", "part_b", "n"])
            .group_by(["part_a", "part_b"])
            .aggregate([("n", "sum")])
        )
        r = r.rename_columns(["part_a", "part_b", "support"])
        r = r.filter(pc.greater_equal(r["support"], FREQ_MIN_SUPPORT))
        return pa.table(
            {
                "part_a": pc.cast(r["part_a"], pa.int64()),
                "part_b": pc.cast(r["part_b"], pa.int64()),
                "support": pc.cast(r["support"], pa.int64()),
            }
        )

    return (
        partials.map_batches(salt, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("p")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


FREQ_ITEMSETS_SQL = f"""
with p as (
  select distinct l1.l_orderkey, l1.l_partkey as a, l2.l_partkey as b
  from lineitem l1
  join lineitem l2
    on l1.l_orderkey = l2.l_orderkey and l1.l_partkey < l2.l_partkey)
select a as part_a, b as part_b, count(*)::bigint as support
from p group by 1, 2
having count(*) >= {FREQ_MIN_SUPPORT}
"""


# keep-rate numerator out of 1000 for the quantile estimation sample
APPROXQ_RATE = 125


def q_approx_quantiles(sf_dir: str):
    """APPROXIMATE global quantiles from a deterministic hash sample —
    the bounded-cost alternative to q_global_quantiles when even the
    value histogram is too wide (high-cardinality doubles, 10^12 rows):
    keep rows with md5(doc_id) mod 1000 < APPROXQ_RATE (reproducible
    across runs/workers — no RNG state), then read EXACT order
    statistics of the sample via the same histogram-of-values plan.
    Sampling error is the standard order-statistic bound (±O(1/√m)
    quantile rank error for sample size m) while shuffle volume drops by
    the sampling factor and stays O(distinct sampled values). The md5
    keep-decision matches the SQL oracle bit-for-bit, so the estimate
    itself is value-verified, not just plausible."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def sample_hist(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        mask = [
            int.from_bytes(_hl.md5(str(i).encode()).digest()[:4], "big")
            % 1000 < APPROXQ_RATE
            for i in ids
        ]
        kept = t.filter(pa.array(mask, pa.bool_()))
        part = kept.select(["n_chars"]).group_by("n_chars").aggregate(
            [([], "count_all")]
        )
        return part.rename_columns(["n_chars", "n"])

    hist = (
        ds.map_batches(sample_hist, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("n_chars")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct sampled values)
        .sort_values("n_chars")
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    vals = hist["n_chars"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0

    def at(q_num: int, q_den: int) -> int:
        idx = ((n - 1) * q_num) // q_den
        return int(vals[np.searchsorted(cum, idx + 1, side="left")])

    return pa.table(
        {
            "n_sample": pa.array([n], pa.int64()),
            "p50_chars": pa.array([at(1, 2)], pa.int64()),
            "p90_chars": pa.array([at(9, 10)], pa.int64()),
            "p99_chars": pa.array([at(99, 100)], pa.int64()),
        }
    )


APPROX_QUANTILES_SQL = f"""
with s as (
  select n_chars from documents
  where ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger
        % 1000 < {APPROXQ_RATE}),
o as (
  select n_chars, row_number() over (order by n_chars) - 1 as r from s),
n as (select count(*)::bigint as c from s)
select (select c from n) as n_sample,
       (select n_chars from o where r = ((select c - 1 from n) * 1) // 2)
         ::bigint as p50_chars,
       (select n_chars from o where r = ((select c - 1 from n) * 9) // 10)
         ::bigint as p90_chars,
       (select n_chars from o where r = ((select c - 1 from n) * 99) // 100)
         ::bigint as p99_chars
"""


def er_corpus() -> str:
    """Lazily write the deterministic record-linkage fixture (fixed
    sf-independent path); both the Ray queries and the oracle composers
    call this, so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_er_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_er_300")
    return write_er_corpus(root, n_entities=300, seed=1)


# max edit distance for a blocked record pair to count as a match
ER_MAX_DIST = 2
# blocking-skew guard: a (city, prefix) block past this size logs and
# star-collapses exact-duplicate names before pairing (common-name hot
# blocks are the levenshtein analog of the LSH hot bucket)
ER_MAX_BLOCK = 10_000


def q_entity_resolve(sf_dir: str):
    """Record linkage by BLOCKING + edit-distance verification — the
    classic Fellegi-Sunter pipeline shape: normalize (lower), block on
    (city, 2-char name prefix) so candidate generation is a bounded
    per-block self-pairing instead of the O(n²) cross product, verify
    each candidate with byte-Levenshtein (DuckDB semantics, same
    ``_lev_bytes`` DP as the dedup verifiers), and emit pairs with
    dist <= ER_MAX_DIST plus the phone-agreement flag a downstream
    scorer would weight. ONE groupby on the block key; per-block pair
    loops are quadratic only in the block size, and a hot block (one
    city's most common name prefix) past ER_MAX_BLOCK logs — the
    production refinement is a second blocking key (phone prefix), the
    same salting story as the LSH hot-bucket cap."""
    rec = rd.read_parquet(er_corpus())

    def prep(t: pa.Table) -> pa.Table:
        nn = pc.utf8_lower(t["name"])
        bk = pc.binary_join_element_wise(
            t["city"], pc.utf8_slice_codeunits(nn, 0, 2), "|"
        )
        return pa.table(
            {
                "rec_id": pc.cast(t["rec_id"], pa.int64()),
                "nn": nn,
                "phone": t["phone"],
                "bk": bk,
            }
        )

    def pair_block(g: pa.Table) -> pa.Table:
        if len(g) > ER_MAX_BLOCK:
            import logging

            logging.getLogger(__name__).warning(
                "entity_resolve: hot block %s (%d rows) — add a second "
                "blocking key", g["bk"][0].as_py(), len(g)
            )
        order = pc.sort_indices(g["rec_id"])
        g = g.take(order)
        ids = g["rec_id"].to_pylist()
        nns = g["nn"].to_pylist()
        phones = g["phone"].to_pylist()
        a, b, dist, same = [], [], [], []
        for i in range(len(ids)):
            bi = nns[i].encode("utf-8")
            for j in range(i + 1, len(ids)):
                d = _lev_bytes(bi, nns[j].encode("utf-8"))
                if d <= ER_MAX_DIST:
                    a.append(ids[i])
                    b.append(ids[j])
                    dist.append(d)
                    same.append(1 if phones[i] == phones[j] else 0)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
                "same_phone": pa.array(same, pa.int64()),
            }
        )

    return (
        rec.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bk")
        .map_groups(pair_block, batch_format="pyarrow")
    )


# sorted-neighborhood window size (pairs with rank gap < SNM_WINDOW)
SNM_WINDOW = 4


def q_snm_pairs(sf_dir: str):
    """Sorted-Neighborhood Method candidate pairs (Hernández-Stolfo):
    rank every record in the GLOBAL (lower(name), rec_id) order, then
    emit all pairs within a rank window of SNM_WINDOW — the complement
    of key blocking that survives first-character typos, since near
    spellings sort near each other regardless of any block key. The
    global rank reuses q_global_rank's no-global-sort decomposition
    (per-key counts -> driver cumsum of base offsets -> per-group
    enumeration; the offset table is O(distinct names) — past driver
    scale the same shape runs as a bucketed distributed prefix sum, cf.
    pack_sequences). Windowing without overlap primitives: each ranked
    row lands in window buckets r//w and r//w + 1, and a pair (ri < rj,
    rj - ri < w) is generated exactly once, in bucket ri//w + 1 — both
    rows are always co-located there, group size is bounded by 2w."""
    rec = rd.read_parquet(er_corpus())

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rec_id": pc.cast(t["rec_id"], pa.int64()),
                "nn": pc.utf8_lower(t["name"]),
            }
        )

    prepped = rec.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        prepped.groupby("nn")
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )  # O(distinct names)
    base: dict[str, int] = {}
    cum = 0
    for r in sorted(counts, key=lambda r: r["nn"]):
        base[r["nn"]] = cum
        cum += r["n"]
    bref = ray.put(base)

    def rank_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["rec_id"]))
        start = offsets[g["nn"][0].as_py()]
        rnk = pa.array(range(start, start + len(g)), pa.int64())
        w1 = pc.divide(rnk, pa.scalar(SNM_WINDOW, pa.int64()))
        out = pa.table({"rec_id": g["rec_id"], "rnk": rnk, "wb": w1})
        out2 = out.set_column(
            2, "wb", pc.add(w1, pa.scalar(1, pa.int64()))
        )
        return pa.concat_tables([out, out2])

    ranked = prepped.groupby("nn").map_groups(
        rank_group, batch_format="pyarrow"
    )

    def window_pairs(g: pa.Table) -> pa.Table:
        wb = g["wb"][0].as_py()
        g = g.take(pc.sort_indices(g["rnk"]))
        ids = g["rec_id"].to_pylist()
        rnks = g["rnk"].to_pylist()
        a, b, gap = [], [], []
        for i in range(len(ids)):
            if rnks[i] // SNM_WINDOW + 1 != wb:
                continue  # this pair belongs to the other bucket copy
            for j in range(i + 1, len(ids)):
                d = rnks[j] - rnks[i]
                if d >= SNM_WINDOW:
                    break
                a.append(ids[i])
                b.append(ids[j])
                gap.append(d)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "gap": pa.array(gap, pa.int64()),
            }
        )

    return ranked.groupby("wb").map_groups(
        window_pairs, batch_format="pyarrow"
    )


def struct_corpus() -> str:
    """Lazily write the deterministic structured-HTML fixture (fixed
    sf-independent path); Ray queries and oracle composers both call
    this, so either side can run first."""
    import tempfile

    from ..sources.synthetic import write_struct_corpus

    root = os.path.join(tempfile.gettempdir(), "aper_struct_150")
    return write_struct_corpus(root, n=150, seed=1)


HEADING_RE = re.compile(r"<h([1-3])>([^<]*)</h\1>")


def q_heading_outline(sf_dir: str):
    """Document-structure extraction: the <h1>/<h2>/<h3> outline of
    every page as (url, pos, level, heading) rows in document order —
    the sectioning pass a web-corpus pipeline runs to split long pages
    at semantic boundaries (chunk_windows' structural sibling). One
    embarrassingly-parallel map_batches over the html column with a
    compiled regex per page; the pattern uses a backreference
    (``</h\\1>``) so it is Python-``re`` only, NOT RE2 — the DuckDB
    oracle's backreference-free ``</h[1-3]>`` agrees because the
    fixture generator emits only well-formed matched heading tags
    (round-4 ADVICE). No shuffle, output is O(headings). At 10^12 docs
    this streams like q_pii_scan."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, poss, lvls, txts = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for k, m in enumerate(HEADING_RE.finditer(h.decode("utf-8"))):
                urls.append(u)
                poss.append(k + 1)
                lvls.append(int(m.group(1)))
                txts.append(m.group(2))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "pos": pa.array(poss, pa.int64()),
                "level": pa.array(lvls, pa.int64()),
                "heading": pa.array(txts, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


TR_RE = re.compile(r"<tr>(.*?)</tr>")
TD_RE = re.compile(r"<td>([^<]*)</td>")


def q_html_tables(sf_dir: str):
    """HTML table extraction: every <td> cell as (url, row_idx, col_idx,
    cell) — the tabular-data recovery pass (web tables are a major
    structured-pretraining source). Two-level linear scan per page
    (rows, then cells within a row) in one stateless map_batches; same
    streaming shape and scale story as q_heading_outline."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, ris, cis, cells = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for ri, tr in enumerate(TR_RE.finditer(h.decode("utf-8"))):
                for ci, td in enumerate(TD_RE.finditer(tr.group(1))):
                    urls.append(u)
                    ris.append(ri + 1)
                    cis.append(ci + 1)
                    cells.append(td.group(1))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "row_idx": pa.array(ris, pa.int64()),
                "col_idx": pa.array(cis, pa.int64()),
                "cell": pa.array(cells, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


RRF_K = 60  # the standard reciprocal-rank-fusion smoothing constant


def q_rank_fusion(sf_dir: str):
    """Hybrid ranking by Reciprocal Rank Fusion (Cormack et al.): fuse
    the BM25 relevance top-K with a quality-prior top-K (stop_ratio,
    the strongest single column of the quality scorer) into one list by
    score(d) = Σ 1/(RRF_K + rank_i(d)) — the standard way a curation
    pipeline combines lexical retrieval with an orthogonal prior
    without calibrating scores against each other. Both constituent
    rankings are the EXISTING distributed operators (bm25's
    narrow-stats scan + dataset_topk; the quality scan + dataset_topk);
    fusion itself touches 2K constant-size rows on the driver — a
    scale-free final reduce, like every top-K finish here. Scores are
    integer ppm (10^6 // (K + rank)) so the fused order hashes
    identically in SQL."""
    K = BM25_TOPK
    bm = q_bm25_search(sf_dir).take_all()  # <= K rows
    bm_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    from ..stages.topk import dataset_topk

    qual = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(tx.quality_batch, batch_format="pyarrow",
                     zero_copy_batch=True)
        .select_columns(["doc_id", "stop_ratio"])
    )
    qtop = dataset_topk(
        qual,
        sort_keys=[("stop_ratio", "descending"), ("doc_id", "ascending")],
        k=K,
    ).take_all()
    q_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(qtop, key=lambda r: (-r["stop_ratio"], r["doc_id"]))
        )
    }
    ids = sorted(set(bm_rank) | set(q_rank))
    out_id, out_ppm, out_rb, out_rq = [], [], [], []
    for d in ids:
        rb = bm_rank.get(d, 0)
        rq = q_rank.get(d, 0)
        ppm = (1_000_000 // (RRF_K + rb) if rb else 0) + (
            1_000_000 // (RRF_K + rq) if rq else 0
        )
        out_id.append(d)
        out_ppm.append(ppm)
        out_rb.append(rb)
        out_rq.append(rq)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "rrf_ppm": pa.array(out_ppm, pa.int64()),
            "rank_bm25": pa.array(out_rb, pa.int64()),
            "rank_quality": pa.array(out_rq, pa.int64()),
        }
    )



DATE_ISO_RE = re.compile(r"Published: (\d{4})-(\d{2})-(\d{2})")
DATE_US_RE = re.compile(r"Published: (\d{2})/(\d{2})/(\d{4})")
DATE_TEXT_RE = re.compile(r"Published: ([A-Z][a-z]+) (\d{1,2}), (\d{4})")
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        [
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November",
            "December",
        ]
    )
}


def q_date_extract(sf_dir: str):
    """Publication-date extraction + normalization: recognize the three
    dominant web date shapes (ISO 8601, US slash, long textual) and
    normalize each to the canonical ISO string and epoch-day integer —
    the freshness signal every crawl pipeline attaches before
    recency-weighted sampling (cf. crawl_schedule / decayed_counts).
    Stateless map_batches over the html column, compiled patterns tried
    in fixed precedence; no shuffle, O(1) output per page. The engine's
    calendar arithmetic is value-verified against DuckDB's independent
    strptime/datediff."""
    import datetime as _dtt

    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])
    epoch = _dtt.date(1970, 1, 1)

    def f(t: pa.Table) -> pa.Table:
        urls, fmts, isos, days = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            s = h.decode("utf-8")
            m = DATE_ISO_RE.search(s)
            if m:
                fmt = "iso"
                d = _dtt.date(int(m.group(1)), int(m.group(2)),
                              int(m.group(3)))
            else:
                m = DATE_US_RE.search(s)
                if m:
                    fmt = "us"
                    d = _dtt.date(int(m.group(3)), int(m.group(1)),
                                  int(m.group(2)))
                else:
                    m = DATE_TEXT_RE.search(s)
                    if not m:
                        continue  # undated page: no row, like the oracle
                    fmt = "text"
                    d = _dtt.date(int(m.group(3)), _MONTHS[m.group(1)],
                                  int(m.group(2)))
            urls.append(u)
            fmts.append(fmt)
            isos.append(d.isoformat())
            days.append((d - epoch).days)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "fmt": pa.array(fmts, pa.string()),
                "date_iso": pa.array(isos, pa.string()),
                "epoch_day": pa.array(days, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


JSONLD_RE = re.compile(
    r'<script type="application/ld\+json">(.*?)</script>', re.DOTALL
)


def q_jsonld_extract(sf_dir: str):
    """Structured-data (JSON-LD) extraction: pull the embedded
    application/ld+json block out of each page and project the typed
    fields — the schema.org metadata pass that yields clean
    (author, type, length) supervision from web pages. Regex-scoped
    block extraction + stdlib json parse per page in one stateless
    map_batches; malformed or absent blocks drop the row (crawl reality;
    same semantics as the oracle's empty-extract filter). Value-verified
    against DuckDB's independent JSON parser."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, types, authors, wcs = [], [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            m = JSONLD_RE.search(h.decode("utf-8"))
            if not m:
                continue
            try:
                obj = json.loads(m.group(1))
            except ValueError:
                continue
            urls.append(u)
            types.append(str(obj.get("@type", "")))
            authors.append(str(obj.get("author", "")))
            wcs.append(int(obj.get("wordCount", 0)))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "item_type": pa.array(types, pa.string()),
                "author": pa.array(authors, pa.string()),
                "word_count": pa.array(wcs, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# hard-negative band: sim in [LO, HI) at 4 dp — above HI is a probable
# near-duplicate (a FALSE negative for contrastive training), below LO
# is an easy negative that contributes no gradient signal
CONTRASTIVE_LO = 0.30
CONTRASTIVE_HI = 0.98
CONTRASTIVE_K = 5


def q_contrastive_pairs(sf_dir: str):
    """Hard-negative mining for contrastive training (the DPR/SimCSE
    data-prep step): for each query vector, the top-K most-similar
    OTHER vectors whose cosine falls inside [LO, HI) — similar enough
    to be hard, not so similar they are near-duplicates (the classic
    false-negative trap; HI is the same boundary embedding_neardup
    flags). Same distributed shape as q_knn_brute: broadcast query
    matrix in the actor constructor, per-batch matmul + band filter +
    partial top-K, final per-query reduce over O(K x blocks) rows.
    Sims are ranked at 4 dp with vec_id tie-break on both sides and the
    value itself is excluded from the output, exactly like knn_brute."""
    qv = _query_vectors(sf_dir)

    class BandedKnn:
        def __init__(self, queries, k: int):
            self.query_ids = np.asarray(queries["ids"], dtype=np.int64)
            self.Q = sim._normalize(
                np.asarray(queries["vecs"], dtype=np.float64)
            )
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            M = sim._normalize(sim.embeddings_matrix(batch, "embedding"))
            sims = np.round(self.Q @ M.T, 4)
            out_q, out_n, out_s = [], [], []
            for qi in range(sims.shape[0]):
                qid = int(self.query_ids[qi])
                cand = [
                    j
                    for j in range(sims.shape[1])
                    if ids[j] != qid
                    and CONTRASTIVE_LO <= sims[qi, j] < CONTRASTIVE_HI
                ]
                cand.sort(key=lambda j: (-sims[qi, j], ids[j]))
                for j in cand[: self.k]:
                    out_q.append(qid)
                    out_n.append(int(ids[j]))
                    out_s.append(float(sims[qi, j]))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "negative_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        BandedKnn, fn_constructor_args=(qv, CONTRASTIVE_K),
        batch_format="pyarrow", concurrency=_apool(),
    )

    def final(g: pa.Table) -> pa.Table:
        order = sorted(
            range(len(g)),
            key=lambda i: (-g["sim"][i].as_py(), g["negative_id"][i].as_py()),
        )
        keep = order[:CONTRASTIVE_K]
        return pa.table(
            {
                "query_id": pc.take(g["query_id"], pa.array(keep)),
                "negative_id": pc.take(g["negative_id"], pa.array(keep)),
            }
        )

    return partials.groupby("query_id").map_groups(
        final, batch_format="pyarrow"
    )


CONTRASTIVE_SQL = f"""
with q as (select vec_id as qid, embedding as qe from embeddings
           order by vec_id limit {{NQ}}),
scored as (select q.qid, e.vec_id as nid,
                  round(list_cosine_similarity(q.qe::double[],
                        e.embedding::double[]), 4) as sim
           from q cross join embeddings e
           where e.vec_id <> q.qid),
banded as (select * from scored
           where sim >= {CONTRASTIVE_LO} and sim < {CONTRASTIVE_HI}),
ranked as (select *, row_number() over
             (partition by qid order by sim desc, nid asc) as rn
           from banded)
select qid as query_id, nid as negative_id
from ranked where rn <= {CONTRASTIVE_K}
"""



MD_BLOCK_RE = re.compile(r"<(h1|h2|h3|p)>([^<]*)")
_MD_PREFIX = {"h1": "# ", "h2": "## ", "h3": "### ", "p": ""}


def q_html_to_markdown(sf_dir: str):
    """HTML -> Markdown linearization: every block element (h1/h2/h3/p)
    becomes one markdown line in document order — the lossy-but-clean
    text rendering LLM-pretraining pipelines prefer over raw-text
    stripping because heading structure survives as '#' prefixes.
    Single compiled-regex scan per page in a stateless map_batches
    (same streaming shape as q_heading_outline); table cells are
    intentionally excluded (q_html_tables is the structured path for
    those). Output is (url, pos, md)."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        urls, poss, mds = [], [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for k, m in enumerate(MD_BLOCK_RE.finditer(h.decode("utf-8"))):
                urls.append(u)
                poss.append(k + 1)
                mds.append(_MD_PREFIX[m.group(1)] + m.group(2))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "pos": pa.array(poss, pa.int64()),
                "md": pa.array(mds, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_t_closeness(sf_dir: str):
    """t-closeness audit (Li et al., the third of the privacy trio after
    k_anonymity / l_diversity): for each quasi-identifier group (source)
    the total-variation distance between its sensitive-attribute (lang)
    distribution and the corpus-global one — a group whose language mix
    diverges more than t leaks membership information. Dataflow: ONE
    per-batch (source, lang) pre-count -> grouped Sum (the combiner
    shape: shuffle is O(sources x langs)); the global lang distribution
    is the tiny per-lang rollup of that same table, broadcast as plain
    floats; the per-source finish runs in groupby(source) groups bounded
    by the lang-alphabet size. tv is rounded to 6 dp on both sides."""
    counts = (
        _read(sf_dir, "documents", ["source", "lang"])
        .map_batches(
            lambda t: t.group_by(["source", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "lang", "n"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["source", "lang"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .materialize()
    )
    glob = counts.groupby("lang").aggregate(
        ray.data.aggregate.Sum("n", alias_name="n")
    ).take_all()  # O(langs) — the sensitive-attribute alphabet
    total = sum(r["n"] for r in glob)
    q_dist = {r["lang"]: r["n"] / total for r in glob}

    def finish(g: pa.Table) -> pa.Table:
        langs = g["lang"].to_pylist()
        ns = g["n"].to_pylist()
        n_s = sum(ns)
        have = dict(zip(langs, ns))
        tv = 0.5 * sum(
            abs(have.get(lang, 0) / n_s - qd)
            for lang, qd in q_dist.items()
        )
        return pa.table(
            {
                "source": pa.array([g["source"][0].as_py()], pa.string()),
                "n_docs": pa.array([n_s], pa.int64()),
                "tv": pa.array([round(tv, 6)], pa.float64()),
            }
        )

    return counts.groupby("source").map_groups(
        finish, batch_format="pyarrow"
    )


T_CLOSENESS_SQL = """
with c as (
  select source, lang, count(*)::bigint as n
  from documents group by 1, 2),
s as (select source, sum(n)::bigint as n_s from c group by 1),
g as (select lang, sum(n)::bigint as n_g from c group by 1),
t as (select sum(n_g)::bigint as total from g),
full_grid as (
  select s.source, g.lang, s.n_s, g.n_g,
         coalesce(c.n, 0)::bigint as n
  from s cross join g
  left join c on c.source = s.source and c.lang = g.lang)
select source, max(n_s)::bigint as n_docs,
       round(0.5 * sum(abs(n * 1.0 / n_s
                           - n_g * 1.0 / (select total from t))), 6) as tv
from full_grid group by source
"""


SHARD_PLAN_N = 16  # output shards for the write plan


def q_shard_plan(sf_dir: str):
    """Output-shard planning audit: assign every doc its output shard by
    md5(doc_id) mod N and roll up per-shard row/byte totals + id range —
    the pre-write pass that sizes the partitioned, resumable parquet
    layout (one directory per shard; a rerun skips finished shards) and
    verifies the hash assignment is balanced BEFORE a 100 TB write. One
    per-batch partial aggregate per shard -> one O(N)-row grouped
    merge; the doc bytes never shuffle."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        chars = t["n_chars"].to_pylist()
        agg: dict[int, list] = {}
        for i, c in zip(ids, chars):
            sh = (
                int.from_bytes(_hl.md5(str(i).encode()).digest()[:4], "big")
                % SHARD_PLAN_N
            )
            a = agg.setdefault(sh, [0, 0, i, i])
            a[0] += 1
            a[1] += c
            a[2] = min(a[2], i)
            a[3] = max(a[3], i)
        shards = sorted(agg)
        return pa.table(
            {
                "shard": pa.array(shards, pa.int64()),
                "n_docs": pa.array([agg[s][0] for s in shards], pa.int64()),
                "total_chars": pa.array(
                    [agg[s][1] for s in shards], pa.int64()
                ),
                "min_doc_id": pa.array(
                    [agg[s][2] for s in shards], pa.int64()
                ),
                "max_doc_id": pa.array(
                    [agg[s][3] for s in shards], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("total_chars", alias_name="total_chars"),
            ray.data.aggregate.Min("min_doc_id", alias_name="min_doc_id"),
            ray.data.aggregate.Max("max_doc_id", alias_name="max_doc_id"),
        )
    )


SHARD_PLAN_SQL = f"""
select (('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger
         % {SHARD_PLAN_N})::bigint as shard,
       count(*)::bigint as n_docs,
       sum(n_chars)::bigint as total_chars,
       min(doc_id)::bigint as min_doc_id,
       max(doc_id)::bigint as max_doc_id
from documents
group by 1
"""



EQUIDEPTH_B = 10  # number of equi-depth bins


def q_equidepth_bins(sf_dir: str):
    """Equi-depth feature binning: assign every doc its B-quantile bin
    of n_chars (SQL ``ntile`` semantics: 1-based, first ``n mod B``
    bins take the extra row) — the discretization step feature
    pipelines run before categorical models or stratified sampling.
    Reuses q_global_rank's no-global-sort decomposition: per-(value,
    id-bucket) counts -> driver cumsum of base offsets (O(distinct
    values x buckets), not rows) -> per-group enumeration; the bin is
    then pure arithmetic implementing ntile's actual remainder rule —
    with q, r = divmod(n, B), the FIRST r buckets hold q+1 rows and
    the rest q (a floor(rank*B/n) formula spreads the remainder evenly
    and diverges from SQL whenever n % B != 0; round-4 ADVICE). The
    id-bucket key is monotone in doc_id, so (value, bucket, id-within)
    IS the global (value, id) order."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return t.append_column("bucket", pc.cast(b, pa.int64()))

    with_bucket = docs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        with_bucket.groupby(["n_chars", "bucket"])
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )
    base: dict[tuple[int, int], int] = {}
    cum = 0
    for r in sorted(counts, key=lambda r: (r["n_chars"], r["bucket"])):
        base[(r["n_chars"], r["bucket"])] = cum
        cum += r["n"]
    n_total = cum
    bref = ray.put(base)

    q_sz, rem = divmod(n_total, EQUIDEPTH_B)

    def _ntile(rank: int) -> int:
        # SQL ntile: first `rem` buckets take q_sz+1 rows, rest q_sz
        if rank < rem * (q_sz + 1):
            return rank // (q_sz + 1) + 1
        return rem + (rank - rem * (q_sz + 1)) // q_sz + 1

    def bin_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        start = offsets[(g["n_chars"][0].as_py(), g["bucket"][0].as_py())]
        bins = [_ntile(start + i) for i in range(len(g))]
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_chars": g["n_chars"],
                "bin": pa.array(bins, pa.int64()),
            }
        )

    return with_bucket.groupby(["n_chars", "bucket"]).map_groups(
        bin_group, batch_format="pyarrow"
    )


EQUIDEPTH_SQL = f"""
select doc_id, n_chars,
       ntile({EQUIDEPTH_B}) over (order by n_chars, doc_id)::bigint as bin
from documents
"""


BLOOMJOIN_BITS = 1 << 17
BLOOMJOIN_K = 4


def q_join_bloom_prefilter(sf_dir: str):
    """Bloom-prefiltered join — the shuffle-volume killer for selective
    joins: the small (filtered) build side publishes a 16 KiB Bloom
    filter of its keys; the probe side drops non-members BEFORE the
    join shuffle, so the all-to-all moves only (true matches + the
    tunable false-positive residue) instead of the whole fact table.
    False positives are then removed by the exact bucketed join, so the
    Bloom is pure optimization — the result (urgent-order revenue by
    month) equals the plain join, which is exactly what the oracle
    states. Build: per-batch partial bit positions -> bounded groupby
    (<= BLOOMJOIN_BITS rows) -> driver bit array -> probe-map closure
    (plain value, restart-safe). Probe selectivity is logged."""
    import logging

    import pandas as pd

    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def _positions(keys: np.ndarray) -> np.ndarray:
        """(n, K) Bloom bit positions via vectorized splitmix64 double
        hashing — engine-internal (false positives die in the exact
        join), so the hash needs no SQL twin; the md5 loop this
        replaces was 4.6 s of the op's 4.6 s at sf0.1."""
        x = keys.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        h1 = x >> np.uint64(32)
        h2 = x | np.uint64(1)
        js = np.arange(BLOOMJOIN_K, dtype=np.uint64)
        return (
            (h1[:, None] + js[None, :] * h2[:, None])
            % np.uint64(BLOOMJOIN_BITS)
        ).astype(np.int64)

    def key_positions(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        pos = np.unique(_positions(keys))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    pos_rows = (
        od.map_batches(key_positions, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("pos")
        .count()
        .take_all()  # <= BLOOMJOIN_BITS rows by construction
    )
    bits = np.zeros(BLOOMJOIN_BITS, dtype=bool)
    bits[[r["pos"] for r in pos_rows]] = True

    def probe(t: pa.Table) -> pa.Table:
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        keep = bits[_positions(keys)].all(axis=1)
        kept = t.filter(pa.array(keep))
        if len(t):
            logging.getLogger(__name__).info(
                "bloom prefilter: kept %d/%d lineitems", len(kept), len(t)
            )
        return kept

    li_f = li.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    # exact bucketed join of the two reduced sides (q_join_bucketed shape)
    def tag_orders(t: pa.Table) -> pa.Table:
        m = pc.strftime(t["o_orderdate"], format="%Y-%m")
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["o_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["o_orderkey"], pa.int64()),
                "month": m,
                "price": pa.nulls(len(t), pa.float64()),
                "disc": pa.nulls(len(t), pa.float64()),
                "side": pa.array(["o"] * len(t), pa.string()),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["l_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["l_orderkey"], pa.int64()),
                "month": pa.nulls(len(t), pa.string()),
                "price": t["l_extendedprice"],
                "disc": t["l_discount"],
                "side": pa.array(["l"] * len(t), pa.string()),
            }
        )

    both = od.map_batches(tag_orders, batch_format="pyarrow").union(
        li_f.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "o"][["key", "month"]]
        right = g[g["side"] == "l"][["key", "price", "disc"]]
        m = left.merge(right, on="key", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"month": pd.Series([], dtype="object"),
                 "rev_micro": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        # integer-cent arithmetic: float Sum order varies with shuffle
        # arrival and flipped a month's 2-dp total vs the oracle; the
        # micro-unit (price-cents x discount-percent) sum is exact and
        # order-free at any scale
        m["rev_micro"] = (m["price"] * 100).round().astype("int64") * (
            100 - (m["disc"] * 100).round().astype("int64")
        )
        out = m.groupby("month", as_index=False).agg(
            rev_micro=("rev_micro", "sum"), n=("rev_micro", "size")
        )
        return out

    agg = (
        both.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("month")
        .aggregate(
            ray.data.aggregate.Sum("rev_micro", alias_name="rev_micro"),
            ray.data.aggregate.Sum("n", alias_name="n_lineitems"),
        )
    )
    df = agg.to_pandas()
    # integer half-up to cents BEFORE the float division: pandas .round
    # is half-to-even, DuckDB round() half-up — a month landing on .xx5
    # flips between them; (micro + 50) // 100 is unambiguous
    df["revenue"] = ((df["rev_micro"] + 50) // 100) / 100.0
    df["n_lineitems"] = df["n_lineitems"].astype("int64")
    return df[["month", "revenue", "n_lineitems"]]


JOIN_BLOOM_SQL = """
select strftime(o_orderdate, '%Y-%m') as month,
       ((sum(cast(round(l_extendedprice * 100) as bigint)
             * (100 - cast(round(l_discount * 100) as bigint))) + 50)
        // 100) / 100.0 as revenue,
       count(*)::bigint as n_lineitems
from orders join lineitem on l_orderkey = o_orderkey
where o_orderpriority = '1-URGENT'
group by 1
"""


def q_entity_clusters(sf_dir: str):
    """Entity consolidation: connected components over the
    record-linkage match graph (q_entity_resolve's dist<=2 pairs) —
    every matched record gets its cluster representative (min rec_id),
    the 'golden record' id a master-data pipeline would merge into.
    Reuses the size-routed components machinery of the dedup chain
    (one union-find task under the small limit, join+groupby-min label
    propagation beyond); the oracle replays the chain with the same
    recursive CTE as the near-dup clusters."""
    pairs = q_entity_resolve(sf_dir).select_columns(["a", "b"])
    cc = dd.connected_components(pairs)
    return cc.map_batches(
        lambda t: t.rename_columns(["rec_id", "rep_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )



_DOMAIN_RE = re.compile(r"https://([^/]+)/")
_PAGE_ID_RE = re.compile(r"p(\d+)$")


def q_domain_pagerank(sf_dir: str):
    """Domain-level PageRank by GRAPH COARSENING: aggregate the page
    multigraph to weighted domain edges (one distributed groupby — the
    only corpus-sized step), then run the exact integer fixed-point on
    the coarsened graph, which is bounded by the DOMAIN alphabet (~10^7
    on the real web vs 10^12 pages — the coarsen-then-solve pattern that
    makes host-level rank computable at all). Same integer 1e-9-unit
    arithmetic as q_pagerank (PR_SCALE / 85:100 damping, floor division
    per edge), weighted by edge multiplicity; the oracle unrolls the
    identical recurrence in SQL, so the fixed point is bit-equal."""
    edges = _outlinks_ds(link_corpus())

    def to_domains(t: pa.Table) -> pa.Table:
        sd = pc.extract_regex(t["src"], pattern=r"https://(?P<dom>[^/]+)/")
        dd_ = pc.extract_regex(t["dst"], pattern=r"https://(?P<dom>[^/]+)/")
        return pa.table(
            {
                "sdom": pc.struct_field(sd, "dom"),
                "ddom": pc.struct_field(dd_, "dom"),
            }
        )

    w = (
        edges.map_batches(to_domains, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby(["sdom", "ddom"])
        .aggregate(ray.data.aggregate.Count(alias_name="w"))
        .take_all()
    )  # O(domains^2) upper bound, O(observed domain pairs) actual
    doms = sorted({r["sdom"] for r in w} | {r["ddom"] for r in w})
    ndom = len(doms)
    tw: dict[str, int] = {}
    for r in w:
        tw[r["sdom"]] = tw.get(r["sdom"], 0) + r["w"]
    rank = {d: PR_SCALE // ndom for d in doms}
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ndom)
    for _ in range(PR_ITERS):
        contrib = {d: 0 for d in doms}
        for r in w:
            contrib[r["ddom"]] += rank[r["sdom"]] * r["w"] // tw[r["sdom"]]
        rank = {
            d: base + PR_DAMP_NUM * contrib[d] // PR_DAMP_DEN for d in doms
        }
    return pa.table(
        {
            "domain": pa.array(doms, pa.string()),
            "rank_e9": pa.array([rank[d] for d in doms], pa.int64()),
        }
    )


NEG_CAND_T = 8  # deterministic candidate probes per node
NEG_PER_NODE = 3  # negatives kept per node


def q_graph_negative_edges(sf_dir: str):
    """Negative-edge sampling for link-prediction training (the GNN /
    graph-embedding data-prep step): for every page node, probe
    NEG_CAND_T arithmetic candidates j = (i*131 + t*257 + 13) mod n
    (reproducible across runs/engines — no RNG state), drop self-loops
    and TRUE edges (zero false negatives, the property that matters),
    keep the first NEG_PER_NODE survivors in probe order. The
    true-edge check is one bounded groupby((a, b)) against the distinct
    edge set — candidate volume is O(nodes x T), never node-squared;
    per-node finishing groups are bounded by T."""
    pages_dir = link_corpus()
    n = LINK_N

    def candidates(t: pa.Table) -> pa.Table:
        out_i, out_t, out_j = [], [], []
        for u in t["url"].to_pylist():
            i = int(_PAGE_ID_RE.search(u).group(1))
            for tt in range(NEG_CAND_T):
                j = (i * 131 + tt * 257 + 13) % n
                if j != i:
                    out_i.append(i)
                    out_t.append(tt)
                    out_j.append(j)
        return pa.table(
            {
                "a": pa.array(out_i, pa.int64()),
                "t": pa.array(out_t, pa.int64()),
                "b": pa.array(out_j, pa.int64()),
                "kind": pa.array(["cand"] * len(out_i), pa.string()),
            }
        )

    cand = rd.read_parquet(pages_dir, columns=["url"]).map_batches(
        candidates, batch_format="pyarrow", zero_copy_batch=True
    )

    def edge_ids(t: pa.Table) -> pa.Table:
        a = [int(_PAGE_ID_RE.search(u).group(1))
             for u in t["src"].to_pylist()]
        b = [int(_PAGE_ID_RE.search(u).group(1))
             for u in t["dst"].to_pylist()]
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "t": pa.array([-1] * len(a), pa.int64()),
                "b": pa.array(b, pa.int64()),
                "kind": pa.array(["edge"] * len(a), pa.string()),
            }
        )

    edges = _outlinks_ds(pages_dir).map_batches(
        edge_ids, batch_format="pyarrow", zero_copy_batch=True
    )

    def anti(g: pa.Table) -> pa.Table:
        # one (a, b) pair's rows: candidates survive iff no edge row
        if "edge" in g["kind"].to_pylist():
            return pa.table(
                {"a": pa.array([], pa.int64()),
                 "t": pa.array([], pa.int64()),
                 "b": pa.array([], pa.int64())}
            )
        g = g.take(pc.sort_indices(g["t"]))
        return g.select(["a", "t", "b"]).slice(0, 1)  # distinct candidate

    survivors = cand.union(edges).groupby(["a", "b"]).map_groups(
        anti, batch_format="pyarrow"
    )

    def per_node(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g["t"]))
        g = g.slice(0, NEG_PER_NODE)
        return pa.table(
            {
                "src_id": g["a"],
                "neg_id": g["b"],
                "t": g["t"],
            }
        )

    return survivors.groupby("a").map_groups(
        per_node, batch_format="pyarrow"
    )


def q_score_calibrate(sf_dir: str):
    """Per-source score calibration by percentile rank: each doc's
    n_chars mapped to its WITHIN-SOURCE percentile (integer ppm of
    row_number-1 over n_source-1) — the normalization a curation
    pipeline applies before one global quality threshold so that a
    verbose source and a terse one are cut at the same RELATIVE depth.
    Same no-global-sort rank decomposition as q_global_rank, partitioned
    by source: per-(source, value, id-bucket) counts -> driver cumsum
    within source (O(distinct keys), not rows; the tree-prefix-sum
    upgrade applies past driver scale) -> per-group enumeration +
    integer ppm. Single-row sources calibrate to 0, like SQL."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return t.append_column("bucket", pc.cast(b, pa.int64()))

    with_bucket = docs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        with_bucket.groupby(["source", "n_chars", "bucket"])
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
        .take_all()
    )
    base: dict[tuple[str, int, int], int] = {}
    totals: dict[str, int] = {}
    for r in sorted(
        counts, key=lambda r: (r["source"], r["n_chars"], r["bucket"])
    ):
        key = (r["source"], r["n_chars"], r["bucket"])
        base[key] = totals.get(r["source"], 0)
        totals[r["source"]] = base[key] + r["n"]
    bref = ray.put((base, totals))

    def calibrate(g: pa.Table) -> pa.Table:
        offsets, tot = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        src = g["source"][0].as_py()
        start = offsets[(src, g["n_chars"][0].as_py(),
                         g["bucket"][0].as_py())]
        n_src = tot[src]
        ppm = [
            (start + i) * 1_000_000 // (n_src - 1) if n_src > 1 else 0
            for i in range(len(g))
        ]
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "source": g["source"],
                "calibrated_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return with_bucket.groupby(["source", "n_chars", "bucket"]).map_groups(
        calibrate, batch_format="pyarrow"
    )


SCORE_CALIBRATE_SQL = """
select doc_id, source,
       case when count(*) over (partition by source) > 1
            then (row_number() over
                    (partition by source order by n_chars, doc_id) - 1)
                 * 1000000
                 // (count(*) over (partition by source) - 1)
            else 0 end::bigint as calibrated_ppm
from documents
"""



WAU_WINDOW = 7  # trailing days in the rolling active-user window


def q_wau_rolling(sf_dir: str):
    """Rolling 7-day active users (WAU) per calendar day — the
    engagement metric every event pipeline reports next to DAU. Exact
    and shuffle-bounded: dedupe to DISTINCT (user, day) per batch
    before the first shuffle, fan each active-day out to the <= W
    window days it contributes to, dedupe (window_day, user) with one
    groupby (shuffle is O(active-user-days x W) counters, never raw
    events), and count per day. Days with no events in range simply
    don't appear (same semantics as the oracle's join)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        di = pc.divide(
            pc.cast(day, pa.int64()), pa.scalar(86_400_000_000, pa.int64())
        )
        return (
            pa.table({"user_id": t["user_id"], "day_i": di})
            .group_by(["user_id", "day_i"])
            .aggregate([])
        )

    ud = (
        ds.map_batches(to_days, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["user_id", "day_i"])
        .count()  # distinct via Count aggregate (round-3 ADVICE shape)
        .select_columns(["user_id", "day_i"])
    )
    day_rows = ud.groupby("day_i").count().take_all()
    days_present = {r["day_i"] for r in day_rows}  # O(calendar days)
    dref = ray.put(days_present)

    def fan_out(t: pa.Table) -> pa.Table:
        present = ray.get(dref)
        us, ws = [], []
        for u, d in zip(t["user_id"].to_pylist(), t["day_i"].to_pylist()):
            for k in range(WAU_WINDOW):
                if d + k in present:
                    us.append(u)
                    ws.append(d + k)
        return (
            pa.table(
                {
                    "user_id": pa.array(us, pa.int64()),
                    "wd": pa.array(ws, pa.int64()),
                }
            )
            .group_by(["user_id", "wd"])
            .aggregate([])
        )

    win = (
        ud.map_batches(fan_out, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["user_id", "wd"])
        .count()
        .select_columns(["user_id", "wd"])
    )

    def finish(t: pa.Table) -> pa.Table:
        import datetime as _dtt

        days = [
            (_dtt.date(1970, 1, 1) + _dtt.timedelta(days=int(d))).isoformat()
            for d in t["wd"].to_pylist()
        ]
        return pa.table(
            {
                "day": pa.array(days, pa.string()),
                "wau": pc.cast(t["count()"], pa.int64()),
            }
        )

    return (
        win.groupby("wd")
        .count()
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


WAU_ROLLING_SQL = f"""
with ud as (select distinct user_id, ts::date as day from events),
days as (select distinct day from ud),
win as (
  select distinct d.day, u.user_id
  from days d join ud u on u.day between d.day - {WAU_WINDOW - 1} and d.day)
select strftime(day, '%Y-%m-%d') as day, count(*)::bigint as wau
from win group by 1
"""


def q_hll_cumulative(sf_dir: str):
    """Cumulative distinct users per day from a mergeable HLL sketch —
    the growth-curve op ("how many unique users ever, as of each day")
    that exact counting cannot stream: per-batch partials emit <= 64
    (day, register, rank) rows, one bounded groupby maxes registers per
    day, and the driver prefix-maxes the O(calendar-days x 64) register
    table (days are calendar-bounded at any corpus scale) before
    running the standard estimator per day. The register prefix-max IS
    the HLL union law, so day d's estimate equals a sketch built from
    scratch over all events <= d. Same deterministic md5 hashing and
    exact-integer estimator as approx_distinct_hll, replayed per-day by
    the oracle."""
    from ..stages import sketch as sk

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partials(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.timestamp("us")
        )
        di = pc.divide(
            pc.cast(day, pa.int64()), pa.scalar(86_400_000_000, pa.int64())
        )
        out_d, out_j, out_r = [], [], []
        per_day: dict[int, dict[int, int]] = {}
        for u, d in zip(t["user_id"].to_pylist(), di.to_pylist()):
            if u is None:
                continue
            hv = sk._h60(u)  # the sketch module's md5-hex convention
            j = hv >> sk._HLL_SUFFIX_BITS
            rank = sk.hll_rank(hv & ((1 << sk._HLL_SUFFIX_BITS) - 1))
            regs = per_day.setdefault(d, {})
            if rank > regs.get(j, 0):
                regs[j] = rank
        for d, regs in per_day.items():
            for j, r in regs.items():
                out_d.append(d)
                out_j.append(j)
                out_r.append(r)
        return pa.table(
            {
                "day_i": pa.array(out_d, pa.int64()),
                "j": pa.array(out_j, pa.int64()),
                "rank": pa.array(out_r, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["day_i", "j"])
        .max("rank")
        .take_all()
    )  # O(days x 64)
    days = sorted({r["day_i"] for r in rows})
    by_day: dict[int, dict[int, int]] = {d: {} for d in days}
    for r in rows:
        by_day[r["day_i"]][r["j"]] = r["max(rank)"]
    import datetime as _dtt

    regs = [0] * sk.HLL_M
    out_day, out_est = [], []
    for d in days:
        for j, rk in by_day[d].items():
            if rk > regs[j]:
                regs[j] = rk
        est_t = sk.hll_estimate_batch(
            pa.table(
                {
                    "j": pa.array(range(sk.HLL_M), pa.int64()),
                    "rank": pa.array(regs, pa.int64()),
                }
            )
        )
        out_day.append(
            (_dtt.date(1970, 1, 1) + _dtt.timedelta(days=int(d))).isoformat()
        )
        out_est.append(est_t["est_distinct"][0].as_py())
    return pa.table(
        {
            "day": pa.array(out_day, pa.string()),
            "est_users": pa.array(out_est, pa.float64()),
        }
    )



SPAN_DIV = 16  # anchor sampling rate: keep window-hashes ≡ 0 mod 16


def q_match_spans(sf_dir: str):
    """Copy-span LOCALIZATION (the attribution step after dedup flags a
    pair): sample content-defined anchor positions — byte positions
    whose 16-byte rolling window hash is ≡ 0 mod SPAN_DIV, the same
    ``_rolling_accs`` recurrence CDC chunking uses, so anchors move
    WITH the content under edits — and join anchors across docs on the
    window hash. Every emitted (a, b, a_pos, b_pos) row is a 16-byte
    verbatim match between the two docs at those positions; runs of
    consecutive rows trace out the shared span. Dataflow: stateless
    anchor scan -> one groupby(anchor) with per-group pairing (hot
    anchors = corpus-wide boilerplate windows; the group is capped by
    the same star-collapse argument as the LSH buckets — here the
    word-soup fixture peaks at ~30 docs/anchor so the exact pairing is
    itself the oracle semantics). The oracle replays the identical
    HUGEINT recurrence (shared CTE head with cdc_dedup) and the same
    equi-join."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def anchors(t: pa.Table) -> pa.Table:
        ids_out, t_out, a_out = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            data = (txt or "").encode("utf-8")
            n = len(data)
            if n == 0:
                continue
            w = min(tx.CDC_WINDOW, n)
            h = tx._rolling_accs(
                np.frombuffer(data, dtype=np.uint8).astype(np.uint64), w
            )
            for tt in range(w, n + 1):
                acc = int(h[tt - w])
                if acc % SPAN_DIV == 0:
                    ids_out.append(did)
                    t_out.append(tt)
                    a_out.append(acc)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "pos": pa.array(t_out, pa.int64()),
                "anchor": pa.array(a_out, pa.int64()),
            }
        )

    anc = docs.map_batches(
        anchors, batch_format="pyarrow", zero_copy_batch=True
    )

    def pair_anchor(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("doc_id", "ascending"), ("pos", "ascending")]
        )
        g = g.take(order)
        ids = g["doc_id"].to_pylist()
        poss = g["pos"].to_pylist()
        acc = g["anchor"][0].as_py()
        a, b, ap, bp = [], [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue  # same-doc repeat, not a cross-doc match
                a.append(ids[i])
                b.append(ids[j])
                ap.append(poss[i])
                bp.append(poss[j])
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "a_pos": pa.array(ap, pa.int64()),
                "b_pos": pa.array(bp, pa.int64()),
                "anchor": pa.array([acc] * len(a), pa.int64()),
            }
        )

    return anc.groupby("anchor").map_groups(
        pair_anchor, batch_format="pyarrow"
    )


MERGE_INS_N = 50  # synthetic inserts in the deterministic delta


def q_merge_upserts(sf_dir: str):
    """Lakehouse MERGE (upsert + tombstone-delete + insert) as one
    bounded-group dataflow — the snapshot-maintenance op between full
    recrawls: base rows and delta rows union TAGGED, ONE groupby(key)
    with <= 2 rows per group resolves precedence (delete beats update
    beats base; inserts have no base row), exactly the snapshot_diff
    decomposition. The delta here is derived deterministically from the
    base (update doc_id%10, delete doc_id%17 — delete wins the overlap
    — insert MERGE_INS_N fresh keys), so both engines state the same
    MERGE without a fixture. Output carries row_version (0 base kept /
    1 delta applied) — the audit column an incremental pipeline
    checkpoints."""
    base = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def tag_base(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "op": pa.array(["base"] * len(t), pa.string()),
            }
        )

    def make_delta(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        chars = t["n_chars"].to_pylist()
        out_id, out_lang, out_n, out_op = [], [], [], []
        for i, c in zip(ids, chars):
            if i % 17 == 0:
                out_id.append(i)
                out_lang.append("")
                out_n.append(0)
                out_op.append("del")
            elif i % 10 == 0:
                out_id.append(i)
                out_lang.append("xx")
                out_n.append(c + 1000)
                out_op.append("upd")
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
                "n_chars": pa.array(out_n, pa.int64()),
                "op": pa.array(out_op, pa.string()),
            }
        )

    inserts = pa.table(
        {
            "doc_id": pa.array(
                [1_000_000_000 + k for k in range(MERGE_INS_N)], pa.int64()
            ),
            "lang": pa.array(["new"] * MERGE_INS_N, pa.string()),
            "n_chars": pa.array(
                [100 + k for k in range(MERGE_INS_N)], pa.int64()
            ),
            "op": pa.array(["ins"] * MERGE_INS_N, pa.string()),
        }
    )

    tagged = (
        base.map_batches(tag_base, batch_format="pyarrow",
                         zero_copy_batch=True)
        .union(base.map_batches(make_delta, batch_format="pyarrow",
                                zero_copy_batch=True))
        .union(rd.from_arrow(inserts))
    )

    def resolve(g: pa.Table) -> pa.Table:
        ops = g["op"].to_pylist()
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
                "row_version": pa.array([], pa.int64()),
            }
        )
        if "del" in ops:
            return empty
        for kind, ver in (("upd", 1), ("ins", 1), ("base", 0)):
            if kind in ops:
                row = g.slice(ops.index(kind), 1)
                return pa.table(
                    {
                        "doc_id": row["doc_id"],
                        "lang": row["lang"],
                        "n_chars": row["n_chars"],
                        "row_version": pa.array([ver], pa.int64()),
                    }
                )
        return empty

    return tagged.groupby("doc_id").map_groups(
        resolve, batch_format="pyarrow"
    )


MERGE_UPSERTS_SQL = f"""
with base as (select doc_id, lang, n_chars from documents),
merged as (
  select doc_id, lang, n_chars, 0 as row_version
  from base where doc_id % 17 <> 0 and doc_id % 10 <> 0
  union all
  select doc_id, 'xx', n_chars + 1000, 1
  from base where doc_id % 17 <> 0 and doc_id % 10 = 0
  union all
  select 1000000000 + k, 'new', 100 + k, 1
  from (select unnest(range({MERGE_INS_N})) as k))
select doc_id, lang, n_chars::bigint as n_chars,
       row_version::bigint as row_version
from merged
"""



SPAN_GAP = 64  # max byte gap between anchors inside one merged span


def q_span_intervals(sf_dir: str):
    """Merged copy-span INTERVALS — the gaps-and-islands pass over
    q_match_spans' anchor matches: within a doc pair, consecutive
    anchors whose positions advance by the SAME delta on both sides
    (and by <= SPAN_GAP bytes) belong to one contiguous shared span;
    each island reports its byte interval in both docs plus its anchor
    count — the per-pair evidence a takedown/attribution workflow
    consumes. One groupby(pair) with groups bounded by doc length; the
    island rule is replayed in SQL with lag() + a windowed running sum
    (the canonical gaps-and-islands formulation)."""
    w = tx.CDC_WINDOW
    spans = q_match_spans(sf_dir)

    # one (a, b) pair = one island computation, but a per-pair
    # map_groups is a Python call per group (32 s on the 100k+ pairs of
    # the sf0.1 corpus). Salt-partition on hash(a, b) instead: each
    # partition sorts once and runs the island rule VECTORIZED over all
    # its pairs at once (group changes are just another break flag) —
    # 32 s -> ~4 s, value-identical.
    n_parts = 64

    def salt(t: pa.Table) -> pa.Table:
        p = pc.bit_wise_and(
            pc.add(pc.multiply(pc.cast(t["a"], pa.int64()), 2654435761),
                   t["b"]),
            n_parts - 1,
        )
        return t.append_column("p", pc.cast(p, pa.int64()))

    def islands_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("a", "b", "a_start", "a_end", "b_start",
                           "b_end", "n_anchors")}
            )
        order = pc.sort_indices(
            g, sort_keys=[("a", "ascending"), ("b", "ascending"),
                          ("a_pos", "ascending"), ("b_pos", "ascending")]
        )
        g = g.take(order)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        ap = g["a_pos"].to_numpy(zero_copy_only=False)
        bp = g["b_pos"].to_numpy(zero_copy_only=False)
        brk = np.ones(len(a), dtype=bool)  # row 0 starts an island
        if len(a) > 1:
            da = ap[1:] - ap[:-1]
            db = bp[1:] - bp[:-1]
            same_pair = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
            brk[1:] = ~same_pair | (da > SPAN_GAP) | (da != db)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(a)) - 1
        return pa.table(
            {
                "a": pa.array(a[starts], pa.int64()),
                "b": pa.array(b[starts], pa.int64()),
                "a_start": pa.array(ap[starts] - w + 1, pa.int64()),
                "a_end": pa.array(ap[ends], pa.int64()),
                "b_start": pa.array(bp[starts] - w + 1, pa.int64()),
                "b_end": pa.array(bp[ends], pa.int64()),
                "n_anchors": pa.array(ends - starts + 1, pa.int64()),
            }
        )

    return (
        spans.map_batches(salt, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("p")
        .map_groups(islands_part, batch_format="pyarrow")
    )


def q_partitioned_write_roundtrip(sf_dir: str):
    """Partitioned parquet SINK roundtrip — the resumable-output
    contract as a value-verified op: write documents hive-partitioned
    by lang (one directory per partition, the layout a failed 100 TB
    run resumes by skipping finished partitions), read the directory
    tree back with partition-column discovery, and aggregate per lang
    FROM THE ROUNDTRIPPED DATA. The oracle aggregates the original
    table directly, so a green hash proves the write->read cycle is
    lossless including the partition column itself."""
    import shutil
    import tempfile

    out_root = os.path.join(
        tempfile.gettempdir(), "aper_partwrite",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    if os.path.isdir(out_root):
        shutil.rmtree(out_root)
    _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).write_parquet(
        out_root, partition_cols=["lang"]
    )
    back = rd.read_parquet(out_root)

    def partial(t: pa.Table) -> pa.Table:
        part = t.group_by("lang").aggregate(
            [("doc_id", "count"), ("n_chars", "sum")]
        )
        return part.rename_columns(["lang", "n_docs", "total_chars"])

    return (
        back.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("n_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("total_chars", alias_name="total_chars"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "n_docs": pc.cast(t["n_docs"], pa.int64()),
                    "total_chars": pc.cast(t["total_chars"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


PARTITIONED_WRITE_SQL = """
select lang, count(*)::bigint as n_docs,
       sum(n_chars)::bigint as total_chars
from documents group by lang
"""



DUPRATE_SAMPLE_K = 60  # fixed-size md5-order sample (bounded at any scale)


def q_dup_rate_estimate(sf_dir: str):
    """Corpus duplicate-RATE estimation from a fixed-size uniform
    sample — the pre-dedup planning scalar ("how much will near-dedup
    remove?") that sizes the real dedup job before paying for it. The
    sample is the K smallest docs by md5(doc_id) (KMV-style: a
    deterministic uniform sample whose size is CONSTANT at any corpus
    scale, selected distributedly by the per-block top-K reduce), then
    all C(K,2) pairs verify exact word-3-gram Jaccard in one task —
    bounded work by construction. Output is one row: sample size, pair
    count, pairs at >= 0.5, and the ppm rate whose sampling error is
    the standard binomial bound. Shingles, rounding, and threshold are
    byte-identical to the dedup chain's verify (same ``_shingles`` /
    SQL ``list_intersect`` round-6 formula)."""
    from ..stages.topk import dataset_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_md5(t: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(str(i).encode()).hexdigest()
            for i in t["doc_id"].to_pylist()
        ]
        return t.append_column("mk", pa.array(keys, pa.string()))

    smp = dataset_topk(
        docs.map_batches(add_md5, batch_format="pyarrow",
                         zero_copy_batch=True),
        sort_keys=[("mk", "ascending"), ("doc_id", "ascending")],
        k=DUPRATE_SAMPLE_K,
    ).take_all()  # K rows — constant
    ids = [r["doc_id"] for r in smp]
    txts = {r["doc_id"]: r["text"] for r in smp}
    ids.sort()
    a, b, ta, tb = [], [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
            ta.append(txts[ids[i]])
            tb.append(txts[ids[j]])
    pairs = pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "text_a": pa.array(ta, pa.string()),
            "text_b": pa.array(tb, pa.string()),
        }
    )
    verified = dd.jaccard_pairs_batch(pairs)
    n_pairs = len(verified)
    n_dup = int(
        pc.sum(
            pc.cast(pc.greater_equal(verified["jaccard"], 0.5), pa.int64())
        ).as_py()
        or 0
    )
    return pa.table(
        {
            "n_sample": pa.array([len(ids)], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_dup": pa.array([n_dup], pa.int64()),
            "dup_rate_ppm": pa.array(
                [n_dup * 1_000_000 // n_pairs if n_pairs else 0], pa.int64()
            ),
        }
    )


CH_CRAWLERS = 8  # crawler shards on the consistent-hash ring
CH_VNODES = 32  # virtual nodes per crawler (load smoothing)


def q_consistent_hash_assign(sf_dir: str):
    """Consistent-hash domain->crawler assignment — the frontier
    sharding every polite distributed crawler needs: each crawler owns
    CH_VNODES points on a hash ring; a domain goes to the crawler
    owning the first ring point clockwise of md5(domain). Adding or
    removing one crawler remaps only ~1/K of domains (the property
    plain mod-K sharding lacks — that is the op's reason to exist).
    The ring is 256 points built once and closed over (constant size);
    assignment is a stateless vectorized bisect per batch over the
    per-domain rollup. Output carries n_docs so the load balance the
    vnodes buy is itself visible (and asserted in pytest)."""
    import bisect

    ring: list[tuple[int, int]] = []
    for c in range(CH_CRAWLERS):
        for v in range(CH_VNODES):
            h = int(hashlib.md5(f"c{c}v{v}".encode()).hexdigest()[:16], 16)
            ring.append((h, c))
    ring.sort()
    ring_h = [h for h, _ in ring]

    doms = (
        _read(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(ray.data.aggregate.Count(alias_name="n_docs"))
    )

    def assign(t: pa.Table) -> pa.Table:
        crawlers = []
        for d in t["source"].to_pylist():
            dh = int(hashlib.md5(d.encode()).hexdigest()[:16], 16)
            i = bisect.bisect_left(ring_h, dh)
            crawlers.append(ring[i][1] if i < len(ring) else ring[0][1])
        return pa.table(
            {
                "domain": t["source"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "crawler": pa.array(crawlers, pa.int64()),
            }
        )

    return doms.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


CONSISTENT_HASH_SQL = f"""
with ring as (
  select c, v,
         ('0x' || substr(md5('c' || c || 'v' || v), 1, 16))::ubigint as h
  from (select unnest(range({CH_CRAWLERS})) as c)
  cross join (select unnest(range({CH_VNODES})) as v)),
doms as (
  select source as domain, count(*)::bigint as n_docs
  from documents group by 1),
dh as (
  select domain, n_docs,
         ('0x' || substr(md5(domain), 1, 16))::ubigint as h
  from doms)
select d.domain, d.n_docs,
       (select r.c from ring r
        where r.h = coalesce((select min(r2.h) from ring r2
                              where r2.h >= d.h),
                             (select min(r3.h) from ring r3))
        )::bigint as crawler
from dh d
"""



def q_cluster_chaining_audit(sf_dir: str):
    """Transitivity audit of the near-dup clusters — the methodological
    check on single-linkage chaining: a component's member pairs split
    into DIRECT (an actual verified Jaccard>=0.5 edge) and CHAINED
    (merged only through intermediates, the A~B~C but A!~C artifact
    that makes over-aggressive cluster-level dedup delete
    non-duplicates). Reuses the cluster chain's own verified edge list
    and component labels; per-cluster sizes and edge counts union-tag
    into ONE groupby(rep) with <= 2 rows per group, chained = C(sz,2)
    - direct is plain arithmetic. High chained share = lower the LSH
    threshold or switch keep-best to per-edge."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = _lsh_distinct_pairs(sf_dir)
    verified = dd.attach_pair_texts(pairs, docs).map_batches(
        dd.jaccard_pairs_batch, batch_format="pyarrow"
    ).filter(expr="jaccard >= 0.5").select_columns(["a", "b"])
    verified = verified.materialize()  # reused by both branches below
    cc = dd.connected_components(verified).materialize()

    sizes = cc.groupby("rep_id").aggregate(
        ray.data.aggregate.Count(alias_name="sz")
    )

    rep_of = cc.map_batches(
        lambda t: pa.table(
            {"a": t["doc_id"], "rep_id": t["rep_id"]}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # round-4 driver flake: the fixed-partition hash join here died on a
    # degenerate zero-column empty block (the sort/groupby empty-input
    # schema-loss class). safe_join broadcasts the tiny rep map — no
    # shuffle, hazard structurally impossible (stages/joins.py).
    edge_reps = (
        sj.safe_join(
            verified, rep_of, on=("a",), join_type="inner",
            left_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
            right_schema=pa.schema(
                [("a", pa.int64()), ("rep_id", pa.int64())]
            ),
        )
        .groupby("rep_id")
        .aggregate(ray.data.aggregate.Count(alias_name="n_direct"))
    )

    def tag_sizes(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "rep_id": pc.cast(t["rep_id"], pa.int64()),
                "sz": pc.cast(t["sz"], pa.int64()),
                "n_direct": z,
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "rep_id": pc.cast(t["rep_id"], pa.int64()),
                "sz": z,
                "n_direct": pc.cast(t["n_direct"], pa.int64()),
            }
        )

    both = sizes.map_batches(
        tag_sizes, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        edge_reps.map_batches(
            tag_edges, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        sz = pc.cast(t["sz"], pa.int64())
        nd = pc.cast(t["n_direct"], pa.int64())
        pairs_tot = pc.divide(
            pc.multiply(sz, pc.subtract(sz, pa.scalar(1, pa.int64()))),
            pa.scalar(2, pa.int64()),
        )
        return pa.table(
            {
                "rep_id": pc.cast(t["rep_id"], pa.int64()),
                "size": sz,
                "n_direct": nd,
                "n_chained": pc.subtract(pairs_tot, nd),
            }
        )

    return (
        both.groupby("rep_id")
        .aggregate(
            ray.data.aggregate.Sum("sz", alias_name="sz"),
            ray.data.aggregate.Sum("n_direct", alias_name="n_direct"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


CLUSTER_CHAINING_SQL_SUFFIX = """
, sd as (select doc_id, list_distinct(shingles) as sd from sh),
verified as (
  select p.a, p.b
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= 0.5),
edges as (select a as src, b as dst from verified
          union select b, a from verified),
comp as (
  select node, rep_id from (
    with recursive cc3(node, reached) as (
      select src, src from edges
      union
      select cc3.node, e.dst from cc3 join edges e on e.src = cc3.reached
    )
    select node, min(reached) as rep_id from cc3 group by node
  )),
sizes as (select rep_id, count(*)::bigint as sz from comp group by 1),
de as (
  select c.rep_id, count(*)::bigint as nd
  from verified v join comp c on c.node = v.a
  group by 1)
select s.rep_id, s.sz as size,
       coalesce(de.nd, 0)::bigint as n_direct,
       (s.sz * (s.sz - 1) // 2 - coalesce(de.nd, 0))::bigint as n_chained
from sizes s left join de using (rep_id)
"""


RELIABILITY_BIN_WIDTH = 10_000
RELIABILITY_OFFSET = 1_000_000  # keeps the binned value positive, so
# Python floor-div == DuckDB truncating-div


def q_score_reliability(sf_dir: str):
    """Reliability (calibration) curve for the model-based quality
    filter: fixed-width bins of the integer logit vs the observed
    positive rate of a proxy label (lang == 'en' — the signal the
    fixture's logit weights were built against). The eval every learned
    filter needs before its threshold is trusted: monotone pos_ppm
    across bins = well-ordered scores. Composition of two existing
    per-doc passes (logit scores, language column) union-tagged into
    one bounded groupby(doc_id) merge — the snapshot_diff shape — then
    a stateless bin map and an O(bins) rollup."""
    lg = q_quality_logit(sf_dir)
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def tag_logit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "logit_ppm": pc.cast(t["logit_ppm"], pa.int64()),
                "is_en": pa.nulls(len(t), pa.int64()).fill_null(-1),
            }
        )

    def tag_lang(t: pa.Table) -> pa.Table:
        en = pc.cast(
            pc.equal(t["lang"], pa.scalar("en")), pa.int64()
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "logit_ppm": pa.nulls(len(t), pa.int64()).fill_null(
                    -(10**15)
                ),
                "is_en": en,
            }
        )

    merged = (
        lg.map_batches(tag_logit, batch_format="pyarrow",
                       zero_copy_batch=True)
        .union(langs.map_batches(tag_lang, batch_format="pyarrow",
                                 zero_copy_batch=True))
        .groupby("doc_id")
        .aggregate(
            ray.data.aggregate.Max("logit_ppm", alias_name="logit_ppm"),
            ray.data.aggregate.Max("is_en", alias_name="is_en"),
        )
    )

    def binify(t: pa.Table) -> pa.Table:
        b = pc.divide(
            pc.add(t["logit_ppm"], pa.scalar(RELIABILITY_OFFSET,
                                             pa.int64())),
            pa.scalar(RELIABILITY_BIN_WIDTH, pa.int64()),
        )
        return pa.table(
            {
                "bin": pc.cast(b, pa.int64()),
                "n": pa.nulls(len(t), pa.int64()).fill_null(1),
                "n_pos": pc.cast(t["is_en"], pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        ppm = pc.divide(
            pc.multiply(t["n_pos"], pa.scalar(1_000_000, pa.int64())),
            t["n"],
        )
        return pa.table(
            {
                "bin": pc.cast(t["bin"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64()),
                "n_pos": pc.cast(t["n_pos"], pa.int64()),
                "pos_ppm": pc.cast(ppm, pa.int64()),
            }
        )

    return (
        merged.map_batches(binify, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("bin")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("n_pos", alias_name="n_pos"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


DF_STOPWORD_PCT = 30  # document-frequency threshold (percent of corpus)


def q_df_stopwords(sf_dir: str):
    """Data-driven stopword discovery: terms whose document frequency
    exceeds DF_STOPWORD_PCT% of the corpus — the corpus-specific
    high-df list a retrieval or tokenizer pipeline derives instead of
    importing someone else's stopwords (a term in a third of all web
    pages carries ~no retrieval signal; cf. the prefix-filter's
    df-ordering in setsim). Per-batch DISTINCT (doc, term) explode ->
    salted df count (the _grouped_count shape) -> threshold filter
    against the metadata row count. Output is O(high-df terms)."""
    n_docs = _table_rows(sf_dir, "documents")

    def explode(t: pa.Table) -> pa.Table:
        terms: dict[str, int] = {}
        for s in t["text"].to_pylist():
            seen = set()
            for w in (s or "").split(" "):
                if w and w not in seen:
                    seen.add(w)
                    terms[w] = terms.get(w, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(terms.keys()), pa.string()),
                "df": pa.array(list(terms.values()), pa.int64()),
            }
        )

    df = _grouped_sum_str(
        _read(sf_dir, "documents", ["text"]).map_batches(
            explode, batch_format="pyarrow", zero_copy_batch=True
        ),
        key="term", val="df", out="df", n_parts=16,
    )
    # df*100 >= PCT*n  <=>  df >= ceil(PCT*n/100); Ray's filter-expr
    # parser takes a bare column on the left, so precompute the constant
    df_min = -(-DF_STOPWORD_PCT * n_docs // 100)
    return df.filter(
        expr=f"df >= {df_min}"
    ).map_batches(
        lambda t: pa.table(
            {
                "term": t["term"],
                "df": pc.cast(t["df"], pa.int64()),
                "df_ppm": pc.cast(
                    pc.divide(
                        pc.multiply(t["df"],
                                    pa.scalar(1_000_000, pa.int64())),
                        pa.scalar(n_docs, pa.int64()),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


DF_STOPWORDS_SQL = f"""
with tf as (
  select term, count(distinct doc_id)::bigint as df
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '' group by term),
n as (select count(*)::bigint as n_docs from documents)
select term, df,
       (df * 1000000 // (select n_docs from n))::bigint as df_ppm
from tf
where df * 100 >= {DF_STOPWORD_PCT} * (select n_docs from n)
"""



PROPS_K_RE = r'"k": (?P<k>\d+)'


def q_props_extract(sf_dir: str):
    """Semi-structured payload extraction over the REAL scaled events
    table: pull the integer property out of each event's JSON ``props``
    string with one vectorized RE2 kernel (no Python per row — the
    payloads are machine-written, so the regex fast path is exact; a
    crawl pipeline falls back to a JSON parse only for rows the regex
    misses) and roll up per event_type: count, sum, max, and distinct-k
    (per-batch pre-distinct -> grouped count, the combiner shape). The
    oracle re-extracts with DuckDB's real JSON parser — a green hash
    proves the fast path IS the JSON semantics for this payload."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=PROPS_K_RE)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return (
            pa.table({"event_type": t["event_type"], "k": k})
            .group_by(["event_type", "k"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "k", "n"])
        )

    per_k = (
        ds.map_batches(extract, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["event_type", "k"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("k", "count"), ("k", "max")]
        )
        g = g.rename_columns(["event_type", "n_events", "n_distinct_k",
                              "max_k"])
        ksum = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "kn": pc.multiply(t["k"], t["n"]),
                }
            )
            .group_by("event_type")
            .aggregate([("kn", "sum")])
            .rename_columns(["event_type", "sum_k"])
        )
        idx = {v: i for i, v in enumerate(ksum["event_type"].to_pylist())}
        order = [idx[v] for v in g["event_type"].to_pylist()]
        return pa.table(
            {
                "event_type": g["event_type"],
                "n_events": pc.cast(g["n_events"], pa.int64()),
                "n_distinct_k": pc.cast(g["n_distinct_k"], pa.int64()),
                "max_k": pc.cast(g["max_k"], pa.int64()),
                "sum_k": pc.cast(
                    pc.take(ksum["sum_k"], pa.array(order)), pa.int64()
                ),
            }
        )

    return (
        per_k.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("n_events", alias_name="n_events"),
            ray.data.aggregate.Sum("n_distinct_k",
                                   alias_name="n_distinct_k"),
            ray.data.aggregate.Max("max_k", alias_name="max_k"),
            ray.data.aggregate.Sum("sum_k", alias_name="sum_k"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "event_type": t["event_type"],
                    "n_events": pc.cast(t["n_events"], pa.int64()),
                    "n_distinct_k": pc.cast(t["n_distinct_k"], pa.int64()),
                    "max_k": pc.cast(t["max_k"], pa.int64()),
                    "sum_k": pc.cast(t["sum_k"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


PROPS_EXTRACT_SQL = """
with e as (
  select event_type, json_extract(props, '$.k')::bigint as k from events)
select event_type, count(*)::bigint as n_events,
       count(distinct k)::bigint as n_distinct_k,
       max(k)::bigint as max_k,
       sum(k)::bigint as sum_k
from e group by event_type
"""


Q5_REGION = "ASIA"


def q_q5_local_supplier(sf_dir: str):
    """The canonical snowflake join tree (TPC-H Q5, local supplier
    volume): revenue per nation where the CUSTOMER and the SUPPLIER sit
    in the same nation of one region — the query shape that exercises
    every join strategy at once, sized per side: region/nation are
    broadcast dicts (constant), supplier is a broadcast map keyed by
    suppkey (the smallest scaled table — past its cap the same column
    flips to a bucketed join like everything else), orders⋈customer
    and lineitem are the two corpus-scaled sides co-located by ONE
    bucketed hash join on orderkey. Revenue is the integer-cent exact
    sum (the join_bloom_prefilter arithmetic)."""
    import pandas as pd

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia = set(
        reg.loc[reg["r_name"] == Q5_REGION, "r_regionkey"].astype(int)
    )
    nat_in = {
        int(r["n_nationkey"]): r["n_name"]
        for _, r in nat.iterrows()
        if int(r["n_regionkey"]) in asia
    }
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup_nat = {
        int(k): int(n)
        for k, n in zip(sup["s_suppkey"], sup["s_nationkey"])
        if int(n) in nat_in
    }
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).to_pandas()
    cust_nat = {
        int(k): int(n)
        for k, n in zip(cust["c_custkey"], cust["c_nationkey"])
        if int(n) in nat_in
    }
    # NOTE: customer fits the broadcast budget at bench scale; the
    # 100 TB route replaces this dict with a bucketed orders⋈customer
    # join, identical shape to the orderkey join below.
    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"])

    def tag_orders(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_pylist()
        ck = t["o_custkey"].to_pylist()
        rows = [
            (o, cust_nat[c]) for o, c in zip(ok, ck) if c in cust_nat
        ]
        return pa.table(
            {
                "bucket": pa.array(
                    [o & (JOIN_BUCKETS - 1) for o, _ in rows], pa.int64()
                ),
                "key": pa.array([o for o, _ in rows], pa.int64()),
                "c_nat": pa.array([n for _, n in rows], pa.int64()),
                "s_nat": pa.array([-1] * len(rows), pa.int64()),
                "micro": pa.array([0] * len(rows), pa.int64()),
                "side": pa.array(["o"] * len(rows), pa.string()),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        lk = t["l_orderkey"].to_pylist()
        sk = t["l_suppkey"].to_pylist()
        price = t["l_extendedprice"].to_pylist()
        disc = t["l_discount"].to_pylist()
        rows = [
            (o, sup_nat[s],
             round(p * 100) * (100 - round(d * 100)))
            for o, s, p, d in zip(lk, sk, price, disc)
            if s in sup_nat
        ]
        return pa.table(
            {
                "bucket": pa.array(
                    [o & (JOIN_BUCKETS - 1) for o, _, _ in rows], pa.int64()
                ),
                "key": pa.array([o for o, _, _ in rows], pa.int64()),
                "c_nat": pa.array([-1] * len(rows), pa.int64()),
                "s_nat": pa.array([n for _, n, _ in rows], pa.int64()),
                "micro": pa.array([m for _, _, m in rows], pa.int64()),
                "side": pa.array(["l"] * len(rows), pa.string()),
            }
        )

    both = od.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "o"][["key", "c_nat"]]
        right = g[g["side"] == "l"][["key", "s_nat", "micro"]]
        m = left.merge(right, on="key", how="inner")
        m = m[m["c_nat"] == m["s_nat"]]
        if m.empty:
            return pd.DataFrame(
                {"nat": pd.Series([], dtype="int64"),
                 "micro": pd.Series([], dtype="int64")}
            )
        return m.groupby("c_nat", as_index=False).agg(
            micro=("micro", "sum")
        ).rename(columns={"c_nat": "nat"})

    agg = (
        both.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("nat")
        .aggregate(ray.data.aggregate.Sum("micro", alias_name="micro"))
        .to_pandas()
    )
    agg["n_name"] = agg["nat"].map(nat_in)
    agg["revenue"] = ((agg["micro"] + 50) // 100) / 100.0
    return agg[["n_name", "revenue"]]


Q5_SQL = f"""
select n_name,
       ((sum(cast(round(l_extendedprice * 100) as bigint)
             * (100 - cast(round(l_discount * 100) as bigint))) + 50)
        // 100) / 100.0 as revenue
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation on c_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
where r_name = '{Q5_REGION}'
group by n_name
"""



def schema_drift_fixture() -> tuple[str, str]:
    """Two deterministic parquet snapshots with drifted schemas (column
    added, column removed, physical type changed) for q_schema_drift;
    idempotent fixed paths."""
    import tempfile

    import pyarrow.parquet as pq_

    root = os.path.join(tempfile.gettempdir(), "aper_schema_drift")
    a_path = os.path.join(root, "a", "part-0.parquet")
    b_path = os.path.join(root, "b", "part-0.parquet")
    if not (os.path.exists(a_path) and os.path.exists(b_path)):
        os.makedirs(os.path.dirname(a_path), exist_ok=True)
        os.makedirs(os.path.dirname(b_path), exist_ok=True)
        pq_.write_table(
            pa.table(
                {
                    "url": pa.array(["https://a.example/0"], pa.string()),
                    "score": pa.array([10], pa.int64()),
                    "depth": pa.array([1], pa.int32()),
                    "fetch_ts": pa.array([1700000000], pa.int64()),
                }
            ),
            a_path,
        )
        pq_.write_table(
            pa.table(
                {
                    "url": pa.array(["https://a.example/0"], pa.string()),
                    "score": pa.array([10.5], pa.float64()),
                    "fetch_ts": pa.array([1700000100], pa.int64()),
                    "lang": pa.array(["en"], pa.string()),
                }
            ),
            b_path,
        )
    return os.path.dirname(a_path), os.path.dirname(b_path)


def q_schema_drift(sf_dir: str):
    """Schema-drift audit between two dataset snapshots — the
    lake-maintenance check run before an incremental job appends to an
    existing table: per column, whether it was added, removed, kept, or
    changed PHYSICAL parquet type between snapshots. Footer-metadata
    only (zero data rows read — the rowgroup_prune discipline); the
    oracle reads the same footers through DuckDB's ``parquet_schema``,
    so the type names are the parquet spec's, not either engine's."""
    import pyarrow.parquet as pq_

    a_dir, b_dir = schema_drift_fixture()

    def physical(d: str) -> dict[str, str]:
        path = os.path.join(d, os.listdir(d)[0])
        s = pq_.ParquetFile(path).schema
        return {s.column(i).name: s.column(i).physical_type
                for i in range(len(s.names))}

    sa, sb = physical(a_dir), physical(b_dir)
    cols = sorted(set(sa) | set(sb))
    status = []
    for c in cols:
        if c not in sb:
            status.append("removed")
        elif c not in sa:
            status.append("added")
        elif sa[c] != sb[c]:
            status.append("type_changed")
        else:
            status.append("unchanged")
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "type_a": pa.array([sa.get(c, "") for c in cols], pa.string()),
            "type_b": pa.array([sb.get(c, "") for c in cols], pa.string()),
            "status": pa.array(status, pa.string()),
        }
    )


SEASONAL_LAG_DAYS = 7


def q_seasonal_backtest(sf_dir: str):
    """Seasonal-naive forecast backtest: predict each day's per-type
    event volume as the SAME WEEKDAY last week and score MAPE over the
    days where both sides exist — the one-op sanity baseline every
    volume-forecasting pipeline must beat before any model ships.
    Dataflow: per-(type, day) counts (one combiner groupby), the count
    table fans itself forward 7 days as predictions, one bounded
    groupby((type, day)) pairs actual with prediction, and an O(types)
    rollup yields n_days + integer-exact MAPE ppm (per-day terms
    floor-divide by the actual, then the mean floor-divides — order
    fixed and replayed in SQL)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def to_day_counts(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        di = pc.divide(pc.cast(day, pa.int64()),
                       pa.scalar(86_400_000_000, pa.int64()))
        part = (
            pa.table({"event_type": t["event_type"], "day_i": di})
            .group_by(["event_type", "day_i"])
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["event_type", "day_i", "n"])

    counts = (
        ds.map_batches(to_day_counts, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["event_type", "day_i"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .materialize()
    )

    def as_actual(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "event_type": t["event_type"],
                "day_i": pc.cast(t["day_i"], pa.int64()),
                "actual": pc.cast(t["n"], pa.int64()),
                "pred": z,
            }
        )

    def as_pred(t: pa.Table) -> pa.Table:
        z = pa.nulls(len(t), pa.int64()).fill_null(0)
        return pa.table(
            {
                "event_type": t["event_type"],
                "day_i": pc.add(pc.cast(t["day_i"], pa.int64()),
                                pa.scalar(SEASONAL_LAG_DAYS, pa.int64())),
                "actual": z,
                "pred": pc.cast(t["n"], pa.int64()),
            }
        )

    merged = (
        counts.map_batches(as_actual, batch_format="pyarrow",
                           zero_copy_batch=True)
        .union(counts.map_batches(as_pred, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .groupby(["event_type", "day_i"])
        .aggregate(
            ray.data.aggregate.Sum("actual", alias_name="actual"),
            ray.data.aggregate.Sum("pred", alias_name="pred"),
        )
    )

    def terms(t: pa.Table) -> pa.Table:
        et, n1, ape = [], [], []
        for e, a, p in zip(t["event_type"].to_pylist(),
                           t["actual"].to_pylist(),
                           t["pred"].to_pylist()):
            if a > 0 and p > 0:  # both sides exist for this day
                et.append(e)
                n1.append(1)
                ape.append(abs(a - p) * 1_000_000 // a)
        return pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "n_days": pa.array(n1, pa.int64()),
                "ape": pa.array(ape, pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_days": pc.cast(t["n_days"], pa.int64()),
                "mape_ppm": pc.cast(
                    pc.divide(t["ape"], t["n_days"]), pa.int64()
                ),
            }
        )

    return (
        merged.map_batches(terms, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("n_days", alias_name="n_days"),
            ray.data.aggregate.Sum("ape", alias_name="ape"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


SEASONAL_BACKTEST_SQL = f"""
with c as (
  select event_type, (epoch(ts::date)::bigint // 86400) as day_i,
         count(*)::bigint as n
  from events group by 1, 2),
j as (
  select a.event_type,
         abs(a.n - p.n) * 1000000 // a.n as ape
  from c a join c p on p.event_type = a.event_type
                   and p.day_i = a.day_i - {SEASONAL_LAG_DAYS})
select event_type, count(*)::bigint as n_days,
       (sum(ape) // count(*))::bigint as mape_ppm
from j group by event_type
"""



def q_ship_delay_stats(sf_dir: str):
    """Fulfillment-latency distribution: days between order placement
    and line shipment, exact p50/p90 per order priority — the SLA
    report every fulfillment pipeline ends in, and a second user of
    the histogram-of-values order-statistic plan (global_quantiles):
    after one bucketed orderkey join, the shuffle carries (priority,
    delay-day) COUNTERS — the value domain (priorities x ~120 days),
    never the join rows — and the driver reads order statistics off
    the tiny per-priority cumsums."""
    import pandas as pd

    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    # the side tag rides in the SIGN of the date columns (-1 = absent),
    # so the 2x-corpus-sized shuffle carries three ints + one dictionary
    # string per row and no side/null columns
    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["o_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["o_orderkey"], pa.int64()),
                "prio": t["o_orderpriority"],
                "odate": pc.cast(pc.cast(t["o_orderdate"], pa.int64()),
                                 pa.int64()),
                "sdate": pa.nulls(len(t), pa.int64()).fill_null(-1),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pc.cast(
                    pc.bit_wise_and(t["l_orderkey"], JOIN_BUCKETS - 1),
                    pa.int64(),
                ),
                "key": pc.cast(t["l_orderkey"], pa.int64()),
                "prio": pa.nulls(len(t), pa.string()),
                "odate": pa.nulls(len(t), pa.int64()).fill_null(-1),
                "sdate": pc.cast(pc.cast(t["l_shipdate"], pa.int64()),
                                 pa.int64()),
            }
        )

    both = od.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow")
    )
    us_day = 86_400_000_000

    def hist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["odate"] >= 0][["key", "prio", "odate"]]
        right = g[g["sdate"] >= 0][["key", "sdate"]]
        m = left.merge(right, on="key", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"prio": pd.Series([], dtype="object"),
                 "delay": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        m["delay"] = (m["sdate"] - m["odate"]) // us_day
        return m.groupby(["prio", "delay"], as_index=False).size()\
            .rename(columns={"size": "n"})

    partials = both.groupby("bucket").map_groups(
        hist_bucket, batch_format="pandas"
    )

    # final (prio, delay) counter merge via salted Arrow C++ group_by —
    # Dataset.groupby().aggregate(Sum) combines the ~160k partial
    # histogram rows at Python speed (22 s of the op's 26 s at sf0.1);
    # this pass is ~1 s
    n_parts = 64

    def salt(t: pa.Table) -> pa.Table:
        p = pc.bit_wise_and(t["delay"], n_parts - 1)
        return t.append_column("p", pc.cast(p, pa.int64()))

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"prio": pa.array([], pa.string()),
                 "delay": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        r = (
            g.select(["prio", "delay", "n"])
            .group_by(["prio", "delay"])
            .aggregate([("n", "sum")])
        )
        return r.rename_columns(["prio", "delay", "n"])

    hist = (
        partials.map_batches(salt, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("p")
        .map_groups(reduce_part, batch_format="pyarrow")
        .to_pandas()  # O(priorities x delay-day domain)
    )
    out_p, out_n, out_p50, out_p90 = [], [], [], []
    for prio, grp in hist.groupby("prio"):
        grp = grp.sort_values("delay")
        counts = grp["n"].to_numpy(dtype=np.int64)
        vals = grp["delay"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        out_p.append(prio)
        out_n.append(n)
        out_p50.append(int(vals[np.searchsorted(cum, ((n - 1) * 1) // 2
                                                + 1, side="left")]))
        out_p90.append(int(vals[np.searchsorted(cum, ((n - 1) * 9) // 10
                                                + 1, side="left")]))
    return pa.table(
        {
            "priority": pa.array(out_p, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "p50_days": pa.array(out_p50, pa.int64()),
            "p90_days": pa.array(out_p90, pa.int64()),
        }
    )


SHIP_DELAY_SQL = """
with j as (
  select o_orderpriority as p,
         datediff('day', o_orderdate, l_shipdate)::bigint as d
  from orders join lineitem on l_orderkey = o_orderkey),
o as (
  select p, d, row_number() over (partition by p order by d) - 1 as r
  from j),
n as (select p, count(*)::bigint as c from j group by p)
select n.p as priority, n.c as n,
       (select d from o where o.p = n.p and o.r = ((n.c - 1) * 1) // 2)
         ::bigint as p50_days,
       (select d from o where o.p = n.p and o.r = ((n.c - 1) * 9) // 10)
         ::bigint as p90_days
from n
"""


def q_centroid_distances(sf_dir: str):
    """Pairwise distance matrix between per-label embedding centroids —
    the class-geometry audit (which labels are confusable BEFORE any
    classifier is trained): composes the existing label_centroids
    combiner plan (shuffle = O(labels x blocks) partials, never
    vectors), pivots the O(labels x dim) long table on the driver, and
    emits round-6 Euclidean distances over the ROUNDED centroids (same
    values the oracle's avg sees, so the arithmetic is shared, not
    approximately equal)."""
    cen = q_label_centroids(sf_dir).to_pandas()  # O(labels x dim)
    piv = cen.pivot(index="label", columns="pos", values="value")
    labels = sorted(piv.index)
    M = piv.loc[labels].to_numpy(dtype=np.float64)
    la, lb, dist = [], [], []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            d = float(np.sqrt(np.sum((M[i] - M[j]) ** 2)))
            la.append(int(labels[i]))
            lb.append(int(labels[j]))
            dist.append(round(d, 6))
    return pa.table(
        {
            "label_a": pa.array(la, pa.int64()),
            "label_b": pa.array(lb, pa.int64()),
            "dist": pa.array(dist, pa.float64()),
        }
    )



def q_brand_return_rates(sf_dir: str):
    """Per-brand return-rate rollup (the product-quality signal a
    marketplace pipeline feeds back into ranking): lineitems join the
    part dimension and aggregate returns ('R' returnflag) per brand.
    The dimension ships ONCE as a broadcast partkey→brand map (the
    ray.put-once / read-per-actor discipline — part is the classic
    broadcast side; past the budget the same column flips to a
    bucketed join); the fact table contributes per-batch (brand,
    n, n_returned) partials, so the shuffle is O(brands x blocks)."""
    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    bref = ray.put(
        dict(zip((int(k) for k in part["p_partkey"]), part["p_brand"]))
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        brand_of = ray.get(bref)
        agg: dict[str, list] = {}
        for pk, rf in zip(t["l_partkey"].to_pylist(),
                          t["l_returnflag"].to_pylist()):
            b = brand_of[pk]
            a = agg.setdefault(b, [0, 0])
            a[0] += 1
            if rf == "R":
                a[1] += 1
        brands = sorted(agg)
        return pa.table(
            {
                "brand": pa.array(brands, pa.string()),
                "n": pa.array([agg[b][0] for b in brands], pa.int64()),
                "n_returned": pa.array([agg[b][1] for b in brands],
                                       pa.int64()),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        ppm = pc.divide(
            pc.multiply(t["n_returned"], pa.scalar(1_000_000, pa.int64())),
            t["n"],
        )
        return pa.table(
            {
                "brand": t["brand"],
                "n": pc.cast(t["n"], pa.int64()),
                "n_returned": pc.cast(t["n_returned"], pa.int64()),
                "return_ppm": pc.cast(ppm, pa.int64()),
            }
        )

    return (
        li.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("brand")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n"),
            ray.data.aggregate.Sum("n_returned", alias_name="n_returned"),
        )
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


BRAND_RETURN_SQL = """
select p_brand as brand, count(*)::bigint as n,
       sum(case when l_returnflag = 'R' then 1 else 0 end)::bigint
         as n_returned,
       (sum(case when l_returnflag = 'R' then 1 else 0 end) * 1000000
        // count(*))::bigint as return_ppm
from lineitem join part on l_partkey = p_partkey
group by p_brand
"""


def q_part_supply_risk(sf_dir: str):
    """Single-source supply-risk audit: how many DISTINCT suppliers has
    each part actually shipped from, rolled up into a risk histogram
    (n_parts per supplier-count, plus the single-sourced cohort a
    procurement pipeline escalates). Two bounded combiner groupbys:
    per-batch distinct (part, supplier) -> grouped distinct count per
    part (shuffle = distinct pairs, not lineitems) -> O(distinct
    counts) histogram."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        part = t.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        return part.rename_columns(["part", "supp"])

    per_part = (
        li.map_batches(distinct_pairs, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["part", "supp"])
        .count()
        .select_columns(["part", "supp"])
        .groupby("part")
        .aggregate(ray.data.aggregate.Count(alias_name="n_suppliers"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        part = t.select(["n_suppliers"]).group_by("n_suppliers")\
            .aggregate([([], "count_all")])
        return part.rename_columns(["n_suppliers", "n_parts"])

    return (
        per_part.map_batches(hist_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("n_suppliers")
        .aggregate(ray.data.aggregate.Sum("n_parts", alias_name="n_parts"))
        .map_batches(
            lambda t: pa.table(
                {
                    "n_suppliers": pc.cast(t["n_suppliers"], pa.int64()),
                    "n_parts": pc.cast(t["n_parts"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


PART_SUPPLY_RISK_SQL = """
with ps as (
  select l_partkey, count(distinct l_suppkey)::bigint as n_suppliers
  from lineitem group by 1)
select n_suppliers, count(*)::bigint as n_parts
from ps group by n_suppliers
"""



FISHER_TOP_K = 10


def q_fisher_dims(sf_dir: str):
    """Per-dimension Fisher score over the labeled embeddings —
    between-class vs within-class variance per coordinate, the
    classical filter-method feature selector run before any projection
    is trusted: a dimension that separates the label clusters scores
    high, noise dims score ~0. One combiner pass emits per-(label)
    partial moment rows (sum, sum-of-squares, count per dim — the
    O(d²)-free sibling of embed_covariance's plan); the driver finishes
    on the O(labels x dim) moment table and returns the top-K dims by
    round-6 score (ties -> lower dim index). The oracle recomputes the
    same decomposition from raw unnested values."""
    ds = _read(sf_dir, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        labels = np.asarray(t["label"].to_pylist())
        out_l, out_s, out_q, out_n = [], [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.append(int(lab))
            out_s.append(X[m].sum(axis=0).tolist())
            out_q.append((X[m] ** 2).sum(axis=0).tolist())
            out_n.append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "vsum": pa.array(out_s, pa.list_(pa.float64())),
                "vsq": pa.array(out_q, pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("label")
        .map_groups(
            lambda g: pa.table(
                {
                    "label": g["label"].slice(0, 1),
                    "vsum": pa.array(
                        [np.asarray(g["vsum"].to_pylist())
                         .sum(axis=0).tolist()],
                        pa.list_(pa.float64()),
                    ),
                    "vsq": pa.array(
                        [np.asarray(g["vsq"].to_pylist())
                         .sum(axis=0).tolist()],
                        pa.list_(pa.float64()),
                    ),
                    "n": pa.array(
                        [int(pc.sum(g["n"]).as_py())], pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )  # O(labels) rows of dim-length moment vectors
    S = np.asarray([r["vsum"] for r in rows], dtype=np.float64)
    Q = np.asarray([r["vsq"] for r in rows], dtype=np.float64)
    N = np.asarray([r["n"] for r in rows], dtype=np.float64)[:, None]
    n_tot = float(N.sum())
    mu_l = S / N                       # (L, d) class means
    mu = S.sum(axis=0) / n_tot         # (d,) global mean
    between = (N * (mu_l - mu) ** 2).sum(axis=0) / n_tot
    within = ((Q - N * mu_l**2).sum(axis=0)) / n_tot
    score = np.round(between / within, 6)
    order = sorted(range(len(score)), key=lambda i: (-score[i], i))
    keep = order[:FISHER_TOP_K]
    return pa.table(
        {
            "pos": pa.array([i + 1 for i in keep], pa.int64()),
            "fisher": pa.array([float(score[i]) for i in keep],
                               pa.float64()),
        }
    )


FISHER_SQL = f"""
with flat as (
  select label, unnest(embedding) as v,
         generate_subscripts(embedding, 1) as pos
  from embeddings),
lm as (
  select label, pos, sum(v) as s, sum(v * v) as q,
         count(*)::double as n
  from flat group by 1, 2),
g as (select pos, sum(s) / sum(n) as mu, sum(n) as n_tot
      from lm group by pos),
f as (
  select lm.pos,
         sum(lm.n * (lm.s / lm.n - g.mu) * (lm.s / lm.n - g.mu))
           / max(g.n_tot) as between_v,
         sum(lm.q - lm.n * (lm.s / lm.n) * (lm.s / lm.n))
           / max(g.n_tot) as within_v
  from lm join g using (pos) group by lm.pos),
sc as (select pos, round(between_v / within_v, 6) as fisher from f),
r as (select pos, fisher,
             row_number() over (order by fisher desc, pos) as rn
      from sc)
select pos::bigint as pos, fisher from r where rn <= {FISHER_TOP_K}
"""


TRIGRAM_TOP_K = 15


def q_event_trigrams(sf_dir: str):
    """Frequent behavioral motifs: the top-K 3-event sequences over
    per-user time-ordered streams (event_transitions' order-3 sibling —
    bigrams miss the signup→view→purchase vs signup→error→purchase
    distinction that matters for funnel debugging). Per-user groups are
    bounded by a user's event count; the motif rollup shuffles (a, b,
    c, n) counters; top-K via the per-block-partial dataset_topk
    reduce. Ties break lexicographically — replayed identically in
    SQL's double-lag formulation."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        ev = pc.take(g["event_type"], order).to_pylist()
        from collections import Counter

        c = Counter(zip(ev, ev[1:], ev[2:]))
        return pa.table(
            {
                "a": pa.array([k[0] for k in c], pa.string()),
                "b": pa.array([k[1] for k in c], pa.string()),
                "c": pa.array([k[2] for k in c], pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    from ..stages.topk import dataset_topk

    counts = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["a", "b", "c"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "a": t["a"], "b": t["b"], "c": t["c"],
                    "n": pc.cast(t["n"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    return dataset_topk(
        counts,
        sort_keys=[("n", "descending"), ("a", "ascending"),
                   ("b", "ascending"), ("c", "ascending")],
        k=TRIGRAM_TOP_K,
    )


EVENT_TRIGRAMS_SQL = f"""
with o as (
  select user_id, event_type,
         lag(event_type, 1) over w as prev1,
         lag(event_type, 2) over w as prev2
  from events
  window w as (partition by user_id order by ts, event_id)),
t as (
  select prev2 as a, prev1 as b, event_type as c, count(*)::bigint as n
  from o where prev2 is not null
  group by 1, 2, 3)
select a, b, c, n from t
order by n desc, a, b, c limit {TRIGRAM_TOP_K}
"""



SIMHASH_IDF_VOCAB_CAP = 5_000_000  # broadcast budget for the idf table


def q_simhash_idf(sf_dir: str):
    """IDF-WEIGHTED SimHash signatures — the production variant of
    dedup_simhash (Manku et al. use term weights, not ±1): every token
    occurrence votes ±floor(1000·ln(N/df)) per bit, so boilerplate
    tokens that appear in every doc (df == N → weight 0) stop dragging
    unrelated pages into Hamming range, which is exactly the failure
    mode the unweighted signature has on templated web corpora. The df
    table comes from the salted distinct-count pass and ships once via
    ray.put (within SIMHASH_IDF_VOCAB_CAP — past it, the same weight
    attach becomes a token-keyed join, the setsim routing); signatures
    and 16-bit bands come out in the dedup_simhash layout so the whole
    banding/verify chain downstream is reusable unchanged. Weight
    arithmetic is integer (floor) on both sides; the oracle replays
    hash, weight, vote and band bit-for-bit."""
    import math

    n_docs = _table_rows(sf_dir, "documents")
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def distinct_tokens(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for s in t["text"].to_pylist():
            for tok in set(dd._tokens(s or "")):
                cnt[tok] = cnt.get(tok, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(cnt.keys()), pa.string()),
                "df": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    df_tbl = _grouped_sum_str(
        docs.map_batches(distinct_tokens, batch_format="pyarrow",
                         zero_copy_batch=True),
        key="term", val="df", out="df", n_parts=16,
    ).take_all()  # O(vocabulary) — within the broadcast cap by contract
    weights = {
        r["term"]: int(math.floor(math.log(n_docs / r["df"]) * 1000))
        for r in df_tbl
    }
    wref = ray.put(weights)

    def sign(t: pa.Table) -> pa.Table:
        w = ray.get(wref)
        sigs = []
        for s in t["text"].to_pylist():
            toks = dd._tokens(s or "")
            if not toks:
                sigs.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = dd._hash64(tok)
                wt = w[tok]
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)
                        ) & np.uint64(1)
                acc += np.where(bits.astype(bool), wt, -wt)
            out = 0
            for i in np.nonzero(acc > 0)[0]:
                out |= 1 << int(i)
            sigs.append(out)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(sigs, pa.uint64()),
                **{
                    f"band{b}": pa.array(
                        [(s >> (16 * b)) & 0xFFFF for s in sigs],
                        pa.int64(),
                    )
                    for b in range(4)
                },
            }
        )

    return docs.map_batches(sign, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_simhash_hamming_hist(sf_dir: str):
    """Hamming-distance histogram of the SimHash candidate pairs — the
    threshold-selection evidence for the band dedup (where does the
    near-dup mass sit inside the distance budget the 4×16 pigeonhole
    guarantees?). A pure O(4)-row rollup of the existing verified pair
    stream; zero new shuffles beyond the pair chain's own."""
    pairs = _simhash_band_pairs(sf_dir)
    return (
        pairs.groupby("hamming")
        .aggregate(ray.data.aggregate.Count(alias_name="n_pairs"))
        .map_batches(
            lambda t: pa.table(
                {
                    "hamming": pc.cast(t["hamming"], pa.int64()),
                    "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )



TOKEN_QUOTA_B = 300  # per-source token budget


def q_token_quota(sf_dir: str):
    """TOKEN-budget quota sampling per source — the mixing step where
    budgets are what training actually consumes (tokens), not document
    counts (domain_quota's unit): within each source, rank docs
    quality-first (stop_ratio desc, doc_id tie-break) and keep the
    prefix whose INCLUSIVE cumulative token count fits TOKEN_QUOTA_B.
    The running sum uses the per-source rank decomposition
    (score_calibrate's shape) extended to carry token sums: the
    per-(source, score, id-bucket) table holds each group's token
    total, the driver prefix-sums those into base offsets (O(distinct
    keys), not rows), and each bounded group finishes its own exact
    within-group cumsum. Scores ride as integer micro-units so the
    order key is never a float."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def features(t: pa.Table) -> pa.Table:
        qb = tx.quality_batch(t)  # same row order as the input batch
        sr6 = pc.cast(
            pc.round(pc.multiply(qb["stop_ratio"], 1_000_000.0), 0),
            pa.int64(),
        )
        b = pc.divide(t["doc_id"], pa.scalar(RANK_BUCKET, pa.int64()))
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "n_tokens": qb["n_tokens"],
                "sr6": sr6,
                "bucket": pc.cast(b, pa.int64()),
            }
        )

    feats = docs.map_batches(
        features, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = (
        feats.groupby(["source", "sr6", "bucket"])
        .aggregate(ray.data.aggregate.Sum("n_tokens", alias_name="tok"))
        .take_all()
    )  # O(distinct (source, score, bucket))
    base: dict[tuple[str, int, int], int] = {}
    run: dict[str, int] = {}
    for r in sorted(
        counts, key=lambda r: (r["source"], -r["sr6"], r["bucket"])
    ):
        key = (r["source"], r["sr6"], r["bucket"])
        base[key] = run.get(r["source"], 0)
        run[r["source"]] = base[key] + r["tok"]
    bref = ray.put(base)

    def select(g: pa.Table) -> pa.Table:
        offsets = ray.get(bref)
        g = g.take(pc.sort_indices(g["doc_id"]))
        start = offsets[(g["source"][0].as_py(), g["sr6"][0].as_py(),
                         g["bucket"][0].as_py())]
        toks = g["n_tokens"].to_numpy(zero_copy_only=False)
        cum = start + np.cumsum(toks)
        keep = cum <= TOKEN_QUOTA_B
        g = g.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "source": g["source"],
                "n_tokens": g["n_tokens"],
                "cum_tokens": pa.array(cum[keep], pa.int64()),
            }
        )

    return feats.groupby(["source", "sr6", "bucket"]).map_groups(
        select, batch_format="pyarrow"
    )


def q_outline_depth_stats(sf_dir: str):
    """Per-page outline-shape rollup over the structured-HTML fixture:
    heading counts per level and the deepest level used — the
    document-structure features a chunking policy keys on (pages with
    h3 depth split differently than flat pages). One vectorized RE2
    count per level, no Python per row, no shuffle."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        h = pc.cast(t["html"], pa.string())
        n1 = pc.cast(pc.count_substring(h, pattern="<h1>"), pa.int64())
        n2 = pc.cast(pc.count_substring(h, pattern="<h2>"), pa.int64())
        n3 = pc.cast(pc.count_substring(h, pattern="<h3>"), pa.int64())
        depth = pc.if_else(
            pc.greater(n3, 0), pa.scalar(3, pa.int64()),
            pc.if_else(pc.greater(n2, 0), pa.scalar(2, pa.int64()),
                       pc.if_else(pc.greater(n1, 0),
                                  pa.scalar(1, pa.int64()),
                                  pa.scalar(0, pa.int64()))),
        )
        return pa.table(
            {
                "url": t["url"],
                "n_h1": n1,
                "n_h2": n2,
                "n_h3": n3,
                "max_level": depth,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)



def q_minhash_calibration(sf_dir: str):
    """Estimator calibration for the MinHash Jaccard: bucket the
    128-slot signature ESTIMATE by deciles and report the mean EXACT
    Jaccard inside each bucket — the measurement that justifies (or
    indicts) trusting signature agreement in place of text verification
    at a given threshold (Broder's E[matches/k]=J is unbiased; this op
    shows the realized curve on the actual corpus, where LSH candidate
    conditioning skews it). Both per-pair streams are the EXISTING
    operators (signature-agreement estimate; exact n-gram verify) over
    the same candidate set; they meet in salted hash partitions (one
    pandas merge per partition — never a per-pair Python group) and
    roll up to <= 11 decile rows."""
    import pandas as pd
    import zlib

    from .qdedup import _jaccard_over_pairs, _minhash_est_over_pairs

    # ONE candidate-pair set feeds both streams — the delegating public
    # ops each rebuild the LSH chain, which doubled this op's wall
    pairs = _lsh_distinct_pairs(sf_dir).materialize()
    est = _minhash_est_over_pairs(sf_dir, pairs)   # (a, b, est_jaccard)
    exact = _jaccard_over_pairs(sf_dir, pairs)     # (a, b, jaccard)
    n_parts = 32

    def tag(which: str):
        def f(t: pa.Table) -> pa.Table:
            col = "est_jaccard" if which == "est" else "jaccard"
            p = pc.bit_wise_and(
                pc.add(pc.multiply(pc.cast(t["a"], pa.int64()),
                                   2654435761), t["b"]),
                n_parts - 1,
            )
            return pa.table(
                {
                    "p": pc.cast(p, pa.int64()),
                    "a": pc.cast(t["a"], pa.int64()),
                    "b": pc.cast(t["b"], pa.int64()),
                    "v": pc.cast(t[col], pa.float64()),
                    "kind": pa.array([which] * len(t), pa.string()),
                }
            )

        return f

    both = est.map_batches(tag("est"), batch_format="pyarrow").union(
        exact.map_batches(tag("exact"), batch_format="pyarrow")
    )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == "est"][["a", "b", "v"]]
        x = g[g["kind"] == "exact"][["a", "b", "v"]]
        m = e.merge(x, on=["a", "b"], suffixes=("_e", "_x"))
        if m.empty:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "jppm": pd.Series([], dtype="int64")}
            )
        m["bucket"] = np.floor(m["v_e"] * 10).astype("int64")
        m["jppm"] = (m["v_x"] * 1_000_000).round().astype("int64")
        return m.groupby("bucket", as_index=False).agg(
            n=("jppm", "size"), jppm=("jppm", "sum")
        )

    return (
        both.groupby("p")
        .map_groups(merge_part, batch_format="pandas")
        .groupby("bucket")
        .aggregate(
            ray.data.aggregate.Sum("n", alias_name="n_pairs"),
            ray.data.aggregate.Sum("jppm", alias_name="jppm"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "bucket": pc.cast(t["bucket"], pa.int64()),
                    "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
                    "mean_exact_ppm": pc.cast(
                        pc.divide(t["jppm"], t["n_pairs"]), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )



CANONICAL_RE = re.compile(r'<link rel="canonical" href="([^"]*)">')


def q_canonical_extract(sf_dir: str):
    """rel=canonical extraction — the duplicate-variant consolidation
    signal crawlers trust above content similarity (the page ITSELF
    declares its canonical): per page, the declared canonical URL and
    whether it is self-referential. Stateless vectorized RE2 extract
    (one named-group kernel call, no Python per row); a downstream
    dedup chain groups by canonical_url exactly like dedup_exact groups
    by content hash, but with zero text compute."""
    ds = rd.read_parquet(struct_corpus(), columns=["url", "html"])

    def f(t: pa.Table) -> pa.Table:
        h = pc.cast(t["html"], pa.string())
        m = pc.extract_regex(
            h, pattern=r'<link rel="canonical" href="(?P<c>[^"]*)">'
        )
        canon = pc.struct_field(m, "c")
        return pa.table(
            {
                "url": t["url"],
                "canonical_url": canon,
                "is_self": pc.cast(
                    pc.equal(t["url"], canon), pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)



def q_gap_exponential_fit(sf_dir: str):
    """Exponential inter-arrival fit per event type — the Poisson-rate
    MLE behind alerting thresholds and capacity planning. The key
    identity: consecutive gaps TELESCOPE, so Σ gaps = max(ts) − min(ts)
    and the MLE λ = (n−1)/span needs NO ordering, no windows, no
    per-entity groups — just Min/Max/Count combiners per type (the
    cheapest possible shuffle: three scalars per type per block). Rate
    is reported as integer milli-events-per-hour; the final arithmetic
    runs driver-side over the O(event-types) rollup in arbitrary-
    precision Python ints (the product overflows int64 at 10^12
    events, as the docstring math notes)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ti = pc.cast(t["ts"], pa.int64())  # microseconds
        g = (
            pa.table({"event_type": t["event_type"], "ti": ti})
            .group_by("event_type")
            .aggregate([("ti", "min"), ("ti", "max"), ("ti", "count")])
        )
        return g.rename_columns(["event_type", "tmin", "tmax", "n"])

    rolled = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Min("tmin", alias_name="tmin"),
            ray.data.aggregate.Max("tmax", alias_name="tmax"),
            ray.data.aggregate.Sum("n", alias_name="n"),
        )
        .take_all()  # O(event types)
    )
    et, nn, span, rate = [], [], [], []
    for r in sorted(rolled, key=lambda r: r["event_type"]):
        s_us = int(r["tmax"]) - int(r["tmin"])
        s_s = s_us // 1_000_000
        n = int(r["n"])
        et.append(r["event_type"])
        nn.append(n)
        span.append(s_s)
        rate.append(
            (n - 1) * 3_600_000 // s_s if s_s > 0 else 0
        )
    return pa.table(
        {
            "event_type": pa.array(et, pa.string()),
            "n_events": pa.array(nn, pa.int64()),
            "span_s": pa.array(span, pa.int64()),
            "rate_meph": pa.array(rate, pa.int64()),
        }
    )


GAP_EXP_FIT_SQL = """
select event_type, count(*)::bigint as n_events,
       ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)::bigint
         as span_s,
       case when (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 > 0
            then ((count(*) - 1) * 3600000)
                 // ((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000)
            else 0 end::bigint as rate_meph
from events group by event_type
"""


def q_cdc_chunk_stats(sf_dir: str):
    """Chunk-size distribution audit for the CDC dedup: n / total bytes
    / mean (milli-bytes) / exact p50 and p90 chunk length — the check
    that CDC_DIV actually yields the ~64-byte chunks its dedup math
    assumes (a skewed cut distribution silently degrades dedup recall).
    Chunk lengths come from the existing cdc_chunk_batch kernel; the
    length DOMAIN is bounded (a chunk is cut within a few multiples of
    the divisor), so exact order statistics use the histogram-of-values
    plan — counters shuffle, never chunks."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def hist_partial(t: pa.Table) -> pa.Table:
        ch = tx.cdc_chunk_batch(t)
        g = ch.select(["clen"]).group_by("clen").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["chunk_len", "n"])

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("chunk_len")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .to_pandas()  # O(distinct chunk lengths)
        .sort_values("chunk_len")
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    vals = hist["chunk_len"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    total = int((counts * vals).sum())

    def at(q_num: int, q_den: int) -> int:
        idx = ((n - 1) * q_num) // q_den
        return int(vals[np.searchsorted(cum, idx + 1, side="left")])

    return pa.table(
        {
            "n_chunks": pa.array([n], pa.int64()),
            "total_bytes": pa.array([total], pa.int64()),
            "mean_len_milli": pa.array([total * 1000 // n], pa.int64()),
            "p50_len": pa.array([at(1, 2)], pa.int64()),
            "p90_len": pa.array([at(9, 10)], pa.int64()),
        }
    )



KS_SRC_A, KS_SRC_B = "src0", "src1"


def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov distance between two sources'
    length distributions — the drift test a mixing pipeline runs before
    treating two feeds as exchangeable. Exact and integer-valued:
    per-batch (source, value) counters -> one grouped Sum (the shuffle
    is the value domain × 2), the driver evaluates both CDFs on the
    union value grid and maximizes |F_A − F_B| as the cross-multiplied
    integer |c1·N2 − c2·N1| (no float CDFs, so the SQL replay is
    hash-exact). Reports D in ppm plus the value where the supremum is
    attained (min value on ties)."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["source"],
                     value_set=pa.array([KS_SRC_A, KS_SRC_B]))
        )
        g = t.group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "n_chars", "n"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["source", "n_chars"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()
    )  # O(distinct values x 2)
    from collections import defaultdict

    ca: dict[int, int] = defaultdict(int)
    cb: dict[int, int] = defaultdict(int)
    for r in rows:
        (ca if r["source"] == KS_SRC_A else cb)[r["n_chars"]] += r["n"]
    n1, n2 = sum(ca.values()), sum(cb.values())
    best, at = -1, 0
    run1 = run2 = 0
    for v in sorted(set(ca) | set(cb)):
        run1 += ca.get(v, 0)
        run2 += cb.get(v, 0)
        d = abs(run1 * n2 - run2 * n1)
        if d > best:
            best, at = d, v
    return pa.table(
        {
            "n_a": pa.array([n1], pa.int64()),
            "n_b": pa.array([n2], pa.int64()),
            "ks_ppm": pa.array([best * 1_000_000 // (n1 * n2)], pa.int64()),
            "at_value": pa.array([at], pa.int64()),
        }
    )


KS_TEST_SQL = f"""
with f as (
  select source, n_chars from documents
  where source in ('{KS_SRC_A}', '{KS_SRC_B}')),
c as (select source, n_chars, count(*)::bigint as n from f group by 1, 2),
v as (select distinct n_chars from f),
g as (
  select v.n_chars,
         coalesce((select sum(n) from c
                   where source = '{KS_SRC_A}'
                     and c.n_chars <= v.n_chars), 0)::bigint as c1,
         coalesce((select sum(n) from c
                   where source = '{KS_SRC_B}'
                     and c.n_chars <= v.n_chars), 0)::bigint as c2
  from v),
n as (
  select (select count(*) from f where source = '{KS_SRC_A}')::bigint
           as n1,
         (select count(*) from f where source = '{KS_SRC_B}')::bigint
           as n2)
select n.n1 as n_a, n.n2 as n_b,
       ((select max(abs(g.c1 * n.n2 - g.c2 * n.n1)) from g)
        * 1000000 // (n.n1 * n.n2))::bigint as ks_ppm,
       (select g.n_chars from g
        order by abs(g.c1 * n.n2 - g.c2 * n.n1) desc, g.n_chars
        limit 1)::bigint as at_value
from n
"""


def q_caps_ratio(sf_dir: str):
    """Uppercase-pressure quality features: per-doc uppercase share of
    alphabetic chars (ppm) and the ALL-CAPS token count — the
    shouting/boilerplate signal (nav bars, legal disclaimers, OCR junk)
    that complements the punct/stopword ratios of quality_score. Three
    vectorized RE2 count kernels, no Python per row, no shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        txt = t["text"]
        nu = pc.count_substring_regex(txt, pattern="[A-Z]")
        na = pc.count_substring_regex(txt, pattern="[A-Za-z]")
        nc = pc.count_substring_regex(txt, pattern=r"\b[A-Z]{2,}\b")
        na_safe = pc.max_element_wise(
            pc.cast(na, pa.int64()), pa.scalar(1, pa.int64())
        )
        ppm = pc.divide(
            pc.multiply(pc.cast(nu, pa.int64()),
                        pa.scalar(1_000_000, pa.int64())),
            na_safe,
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_upper": pc.cast(nu, pa.int64()),
                "n_alpha": pc.cast(na, pa.int64()),
                "n_caps_tokens": pc.cast(nc, pa.int64()),
                "upper_ppm": pc.cast(ppm, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


CAPS_RATIO_SQL = """
select doc_id,
       length(regexp_extract_all(text, '[A-Z]'))::bigint as n_upper,
       length(regexp_extract_all(text, '[A-Za-z]'))::bigint as n_alpha,
       length(regexp_extract_all(text, '\\b[A-Z]{2,}\\b'))::bigint
         as n_caps_tokens,
       (length(regexp_extract_all(text, '[A-Z]')) * 1000000
        // greatest(length(regexp_extract_all(text, '[A-Za-z]')), 1))
         ::bigint as upper_ppm
from documents
"""



LOGODDS_ALPHA = 1.0  # symmetric Dirichlet pseudo-count per term
LOGODDS_TOP_K = 10


def q_log_odds_terms(sf_dir: str):
    """Most source-distinctive terms by weighted log-odds with a
    Dirichlet prior (Monroe, Colaresi & Quinn 2008) between the two
    comparison sources — the corpus-comparison op that raw frequency
    ratios get wrong (they over-rank rare terms; the prior and the
    per-term variance fix exactly that). One combiner pass counts
    (source, term) occurrences — the shuffle is vocabulary-sized — and
    the driver finishes the O(vocab) z-score arithmetic: delta =
    ln-odds difference with +alpha smoothing, var = 1/(c1+a) + 1/(c2+a),
    z rounded to 6 dp; top-K by |z| with term tie-break, replayed
    term-for-term in SQL."""
    import math

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["source"], value_set=pa.array([KS_SRC_A, KS_SRC_B]))
        )
        cnt: dict[tuple[str, str], int] = {}
        for src_, s in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for w in (s or "").split(" "):
                if w:
                    cnt[(src_, w)] = cnt.get((src_, w), 0) + 1
        return pa.table(
            {
                "source": pa.array([k[0] for k in cnt], pa.string()),
                "term": pa.array([k[1] for k in cnt], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(["source", "term"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
        .take_all()
    )  # O(vocabulary x 2)
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for r in rows:
        (c1 if r["source"] == KS_SRC_A else c2)[r["term"]] = r["n"]
    n1, n2 = sum(c1.values()), sum(c2.values())
    vocab = sorted(set(c1) | set(c2))
    a = LOGODDS_ALPHA
    a0 = a * len(vocab)
    scored = []
    for t in vocab:
        x1, x2 = c1.get(t, 0), c2.get(t, 0)
        delta = math.log((x1 + a) / (n1 + a0 - x1 - a)) - math.log(
            (x2 + a) / (n2 + a0 - x2 - a)
        )
        var = 1.0 / (x1 + a) + 1.0 / (x2 + a)
        scored.append((t, x1, x2, round(delta / math.sqrt(var), 6)))
    scored.sort(key=lambda r: (-abs(r[3]), r[0]))
    top = scored[:LOGODDS_TOP_K]
    return pa.table(
        {
            "term": pa.array([r[0] for r in top], pa.string()),
            "n_a": pa.array([r[1] for r in top], pa.int64()),
            "n_b": pa.array([r[2] for r in top], pa.int64()),
            "z": pa.array([r[3] for r in top], pa.float64()),
        }
    )



PARETO_TOP_PCT = 20  # "what share of volume do the top X% keys carry"


def q_pareto_concentration(sf_dir: str):
    """Pareto concentration of the event volume over users — the
    80/20 diagnostic ("what share of events do the top 20% of users
    generate?") that decides whether per-user salting is needed before
    any user-keyed shuffle. Exact and rank-free: per-user counts (one
    combiner groupby), then the count-of-counts histogram (distinct
    per-user volumes — a tiny domain) is cumulated on the driver from
    the heaviest volume down; integer cross-multiplication picks the
    top-ceil(U*pct/100) users and sums their events, so no user-level
    sort ever happens. Output is one row: users, events, events held
    by the top cohort, and the share in ppm."""
    ds = _read(sf_dir, "events", ["user_id"])

    def per_user(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n"])

    counts = (
        ds.map_batches(per_user, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def hist(t: pa.Table) -> pa.Table:
        g = t.select(["n"]).group_by("n").aggregate([([], "count_all")])
        return g.rename_columns(["n", "n_users"])

    rows = (
        counts.map_batches(hist, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("n")
        .aggregate(ray.data.aggregate.Sum("n_users", alias_name="n_users"))
        .take_all()
    )  # O(distinct per-user volumes)
    rows.sort(key=lambda r: -r["n"])
    users = sum(r["n_users"] for r in rows)
    events = sum(r["n"] * r["n_users"] for r in rows)
    k = -(-users * PARETO_TOP_PCT // 100)  # ceil
    taken = top_events = 0
    for r in rows:
        take = min(r["n_users"], k - taken)
        top_events += take * r["n"]
        taken += take
        if taken >= k:
            break
    return pa.table(
        {
            "n_users": pa.array([users], pa.int64()),
            "n_events": pa.array([events], pa.int64()),
            "top_users": pa.array([k], pa.int64()),
            "top_events": pa.array([top_events], pa.int64()),
            "share_ppm": pa.array(
                [top_events * 1_000_000 // events], pa.int64()
            ),
        }
    )


PARETO_SQL = f"""
with c as (select user_id, count(*)::bigint as n from events group by 1),
tot as (select count(*)::bigint as users, sum(n)::bigint as events from c),
k as (select ((users * {PARETO_TOP_PCT}) + 99) // 100 as k from tot),
r as (select n, row_number() over (order by n desc, user_id) as rn from c)
select t.users as n_users, t.events as n_events,
       (select k from k) as top_users,
       (select sum(n) from r where rn <= (select k from k))::bigint
         as top_events,
       ((select sum(n) from r where rn <= (select k from k)) * 1000000
        // t.events)::bigint as share_ppm
from tot t
"""


LEDGER_RUNS = 6


def ledger_fixture() -> str:
    """Deterministic cross-run metrics-ledger fixture: LEDGER_RUNS runs
    x (wave1, wave2) rows written THROUGH state.ledger.append_run — the
    same writer the flagship uses — so the drift query exercises the
    production parquet layout, not a hand-rolled copy. Idempotent
    (manifest marker, the fixture idiom)."""
    import tempfile

    from ..state import ledger as lg

    root = os.path.join(tempfile.gettempdir(), "aper_ledger_6")
    marker = os.path.join(root, "_manifest.json")
    want = {"kind": "ledger", "runs": LEDGER_RUNS, "v": 1}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return root
    os.makedirs(root, exist_ok=True)
    for i in range(LEDGER_RUNS):
        # drifting corpus: rows grow, errors spike on run 3, misses
        # decay as the rule store warms
        lg.append_run(
            root, run_id=f"run{i:02d}", seq=i,
            waves={
                "wave1": {
                    "rows": 1000 + 120 * i,
                    "errors": 2 + (25 if i == 3 else 0),
                    "miss_rows": max(0, 80 - 30 * i),
                    "rules_fitted": 12 if i == 0 else 0,
                    "rules_total": 12,
                    "wall_ms": 900 + 17 * i,
                },
                "wave2": {
                    "rows": max(0, 80 - 30 * i),
                    "errors": 1 if i == 3 else 0,
                    "miss_rows": 0,
                    "rules_fitted": 0,
                    "rules_total": 12,
                    "wall_ms": 300,
                },
            },
        )
    with open(marker, "w") as f:
        json.dump(want, f)
    return root


def q_ledger_drift(sf_dir: str):
    """Cross-run metrics drift over the parquet ledger (ROADMAP item 6):
    per-run totals (waves summed) joined to the PREVIOUS run on
    ``seq - 1 = seq`` — the window-free LAG idiom (q_event_lag's
    sibling), so no global sort and no per-key giant group; the ledger
    is O(runs x waves) rows however big the corpus is. Output: each run
    after the first with its row/error/miss deltas — the regression
    signal a recurring corpus job alerts on. DuckDB-verified against
    the real ``lag()`` window function."""
    root = ledger_fixture()
    led = rd.read_parquet(
        root, columns=["run_id", "seq", "rows", "errors", "miss_rows"]
    )
    tot = (
        led.groupby(["run_id", "seq"])
        .aggregate(
            ray.data.aggregate.Sum("rows", alias_name="rows"),
            ray.data.aggregate.Sum("errors", alias_name="errors"),
            ray.data.aggregate.Sum("miss_rows", alias_name="miss_rows"),
        )
    )

    def prev_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pseq": pc.cast(t["seq"], pa.int64()),
                "prows": pc.cast(t["rows"], pa.int64()),
                "perrors": pc.cast(t["errors"], pa.int64()),
                "pmiss": pc.cast(t["miss_rows"], pa.int64()),
            }
        )

    prev = tot.map_batches(
        prev_key, batch_format="pyarrow", zero_copy_batch=True
    )

    def cur_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "run_id": t["run_id"],
                "seq": pc.cast(t["seq"], pa.int64()),
                "pseq": pc.subtract(
                    pc.cast(t["seq"], pa.int64()),
                    pa.scalar(1, pa.int64()),
                ),
                "rows": pc.cast(t["rows"], pa.int64()),
                "errors": pc.cast(t["errors"], pa.int64()),
                "miss_rows": pc.cast(t["miss_rows"], pa.int64()),
            }
        )

    cur = tot.map_batches(
        cur_key, batch_format="pyarrow", zero_copy_batch=True
    )
    j = sj.safe_join(
        cur, prev, join_type="inner", on=("pseq",),
        left_schema=pa.schema(
            [("run_id", pa.string()), ("seq", pa.int64()),
             ("pseq", pa.int64()), ("rows", pa.int64()),
             ("errors", pa.int64()), ("miss_rows", pa.int64())]
        ),
        right_schema=pa.schema(
            [("pseq", pa.int64()), ("prows", pa.int64()),
             ("perrors", pa.int64()), ("pmiss", pa.int64())]
        ),
    )

    def deltas(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "run_id": t["run_id"],
                "seq": t["seq"],
                "rows": t["rows"],
                "d_rows": pc.subtract(t["rows"], t["prows"]),
                "d_errors": pc.subtract(t["errors"], t["perrors"]),
                "d_miss": pc.subtract(t["miss_rows"], t["pmiss"]),
            }
        )

    return j.map_batches(
        deltas, batch_format="pyarrow", zero_copy_batch=True
    )
