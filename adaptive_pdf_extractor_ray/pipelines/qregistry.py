"""QUERIES / ORACLES registries, oracle composers, queries() / oracle_sql() entry points.

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
    CRAWL_DELAY_S, EDITDIST_CAP, _pq,
)
from .qdedup import (  # noqa: F401
    DECON_SEM_MOD, DECON_SEM_TAU, EMBED_DIMS, EMBED_QUANTIZE_SQL,
    JL_OUT_DIMS, KNN_K, N_QUERIES,
)
from .qsimilarity import (  # noqa: F401
    COVER_K, EMBED_MATRYOSHKA_SQL, KC_K, KNNG_ORACLE_SQL,
    LSH_PLANES, LSH_TABLES, PQ_M, PQ_SUB,
    SEM_TAU, _centroid_literals, _embedding_dim, _pq_codebooks,
)
from .qrelational import (  # noqa: F401
    HH_DENOM, SESSION_GAP_S,
)
from .qmedia import (  # noqa: F401
    VOCAB_TOP_K,
)
from .qflagship import (  # noqa: F401
    card_corpus, flagship_corpus,
)
from .qquality import (  # noqa: F401
    DECON_LEN, DECON_MAX_ID, DECON_MOD, DECON_OFF,
    DOMAIN_QUOTA, LINK_N, PR_ITERS,
)
from .qgraph import (  # noqa: F401
    BAD_URL_WORDS, DOMAIN_REP_MIN_STOP, KCORE_K, KCORE_ROUNDS,
    LANG_MIN_DENSITY_PCT, LANG_WORDS, LINKDIST_MAX, PHASH_BANDS,
    PHASH_BITS, PHASH_HAM_T, PR_DAMP_DEN, PR_DAMP_NUM,
    PR_SCALE, TFIDF_COS_DF_CAP, TFIDF_COS_TAU, TRUST_MOD,
    crawl_diff_corpus, jsonl_corpus, link_corpus, recrawl_corpus,
)
from .qcuration import (  # noqa: F401
    BIGRAM_K, DOMAIN_LINE_MIN, DOMAIN_LINE_PCT, LINE_MIN_DOCS,
    LM_LAMBDA, MIX_SCALE, PACK_BUDGET, SPLIT_BUCKETS,
    SPLIT_TRAIN,
)
from .qtraining import (  # noqa: F401
    BM25_B, BM25_K1, BM25_TERMS, BM25_TOPK,
    DSIR_WEIGHTS_SQL, EMBEDDING_OUTLIERS_SQL, SPLIT_ASSIGN_SQL, SPLIT_VALID,
    TOP_TERMS_BY_LANG_SQL, warc_corpus,
)
from .qwarc import (  # noqa: F401
    BLOOM_DEDUP_SQL, BPE_MERGES, BPE_PAIRS_SQL, RESERVOIR_K,
    WARC_FETCH_MOD,
)
from .qanalytics import (  # noqa: F401
    CLUSTER_SAMPLE_Q, COCITE_MIN_COMMON, COLLOC_MIN_COUNT, CROSS_MOD,
    CROSS_TAU, DECAY_HALFLIFE_US, DEDUP_EVAL_K, HASH_FEATURE_BUCKETS,
    HITS_ITERS, HITS_SCALE, KMEANS_K, LOGIT_WEIGHT_SPAN,
    LP_ITERS, PHRASES, PREFIX_K, RANGE_WINDOW_S,
    REDIR_BLOCK, RFM_DAY_US, SAMPLE_WS_K, SAMPLE_W_K,
    SKEW_DIM, SWEEP_TAUS_1E4, TOPIC_LEXICON, TOP_DOCS_PER_SOURCE,
    TRAP_DUP_FACTOR, TRAP_MIN_URLS, XLANG_K, XLANG_SRC,
    XLANG_TAU_1E4, XLANG_TGT, urltrap_corpus,
)
from .qglobalstats import (  # noqa: F401
    AB_LIFT_SQL, ATTRIBUTION_DELAY_SQL, COPY_SEARCH_K, CORPUS_KL_TOP_K,
    CRAWL_BUDGET_SQL, DOMAIN_GINI_SQL, EVENT_BURSTINESS_SQL, EVENT_CUSUM_SQL,
    EVENT_GAPS_HIST_SQL, EV_STAT_ITERS, EV_STAT_SCALE, K_ANON,
    LENGTH_LOGNORMAL_SQL, L_DIVERSITY_SQL, PROFILE_COLUMNS, PRUNE_NCHARS,
    SESSION_PATH_TOP_K, USER_FEATURES_SQL, USER_SURVIVAL_SQL, WEEKDAY_SEASONALITY_SQL,
    ZIPF_TOP_K, _pca_top_component, csv_corpus, rowgroup_corpus,
)
from .qpii import (  # noqa: F401
    BITEXT_ORACLE_SQL, PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE,
    PII_SSN_RE, SNAPSHOT_ASOF_TS, pii_corpus,
)
from .qsnapshot import (  # noqa: F401
    BUILD_POSTINGS_SQL, LINKDENS_BOILER_PPM, QUALITY_COMPOSITE_SQL,
)
from .qextras import (  # noqa: F401
    ledger_fixture, q_ledger_drift,
    APPROX_QUANTILES_SQL, BRAND_RETURN_SQL, CAPS_RATIO_SQL, CLUSTER_CHAINING_SQL_SUFFIX,
    CONSISTENT_HASH_SQL, CONTRASTIVE_SQL, DF_STOPWORDS_SQL, DUPRATE_SAMPLE_K,
    EQUIDEPTH_SQL, ER_MAX_DIST, EVENT_TRIGRAMS_SQL, FISHER_SQL,
    FREQ_ITEMSETS_SQL, GAP_EXP_FIT_SQL, JOIN_BLOOM_SQL, JOIN_OUTER_SQL,
    KS_SRC_A, KS_SRC_B, KS_TEST_SQL, LOGODDS_ALPHA,
    LOGODDS_TOP_K, MERGE_UPSERTS_SQL, NEG_CAND_T, NEG_PER_NODE,
    PARETO_SQL, PARTITIONED_WRITE_SQL, PART_SUPPLY_RISK_SQL, PROPS_EXTRACT_SQL,
    Q5_SQL, RELIABILITY_BIN_WIDTH, RELIABILITY_OFFSET, RRF_K,
    SCORE_CALIBRATE_SQL, SEASONAL_BACKTEST_SQL, SHARD_PLAN_SQL, SHIP_DELAY_SQL,
    SNM_WINDOW, SPAN_DIV, SPAN_GAP, TOKEN_QUOTA_B,
    T_CLOSENESS_SQL, WAU_ROLLING_SQL, er_corpus, schema_drift_fixture,
    struct_corpus,
)

from .qanalytics import (  # noqa: F401
    q_ann_recall, q_approx_distinct_hll, q_cluster_sample, q_cocitation,
    q_cohort_retention, q_collocations, q_dau, q_decayed_counts,
    q_dedup_cross_corpus, q_dedup_eval_exact, q_dedup_eval_lsh, q_dedup_prefix,
    q_dedup_simhash_clusters, q_dedup_simhash_pairs, q_dedup_threshold_sweep, q_degree_distribution,
    q_dom_templates, q_domain_dup_stats, q_dup_cluster_sizes, q_event_transitions,
    q_filter_agreement, q_funnel, q_global_quantiles, q_graph_triangles,
    q_hapax_rate, q_hash_features, q_hits_rank, q_join_skewed,
    q_key_skew, q_kmeans, q_label_prop, q_late_events,
    q_lexical_diversity, q_link_components, q_mirror_domains, q_mojibake,
    q_orders_without_lineitems, q_phrase_search, q_pivot_events, q_posting_gaps,
    q_quality_logit, q_quantiles_by_domain, q_range_join, q_range_join_bucketed,
    q_readability, q_redirects, q_rollup_source_lang, q_running_total,
    q_sample_reservoir, q_sample_weighted, q_sample_weighted_stratified, q_scd2_intervals,
    q_script_mix, q_session_stats, q_split_token_budget, q_tokenizer_fertility,
    q_top_docs_per_source, q_topic_tag, q_url_history, q_url_templates,
    q_user_rfm, q_vocab_coverage, q_winsorize, q_xlang_mine,
)
from .qcuration import (  # noqa: F401
    q_bigram_topk, q_build_training_set, q_chunk_windows, q_clean_c4,
    q_decontaminate_ngram, q_dedup_substring, q_domain_stats, q_line_dedup,
    q_line_dedup_domain, q_lm_bigram, q_lm_score, q_mix_rebalance,
    q_pack_sequences, q_pii_redact, q_quality_tiers, q_url_dedup,
)
from .qdedup import (  # noqa: F401
    q_cdc_dedup, q_decontaminate_semantic, q_dedup_containment, q_dedup_editdist,
    q_dedup_exact, q_dedup_jaccard, q_dedup_keep_best, q_dedup_minhash,
    q_dedup_minhash_clusters, q_dedup_minhash_est, q_dedup_simhash, q_embed_project,
    q_embed_quantize, q_embedding_neardup, q_inverted_index, q_ngram_novelty,
    q_setsim_join, q_syndication_pairs, q_tfidf_top_terms,
)
from .qextras import (  # noqa: F401
    q_approx_quantiles, q_brand_return_rates, q_canonical_extract, q_caps_ratio,
    q_cdc_chunk_stats, q_centroid_distances, q_cluster_chaining_audit, q_consistent_hash_assign,
    q_contrastive_pairs, q_date_extract, q_df_stopwords, q_domain_pagerank,
    q_dup_rate_estimate, q_entity_clusters, q_entity_resolve, q_equidepth_bins,
    q_event_trigrams, q_fisher_dims, q_freq_itemsets, q_gap_exponential_fit,
    q_graph_negative_edges, q_heading_outline, q_hll_cumulative, q_html_tables,
    q_html_to_markdown, q_join_bloom_prefilter, q_jsonld_extract, q_ks_test,
    q_log_odds_terms, q_match_spans, q_merge_upserts, q_minhash_calibration,
    q_outline_depth_stats, q_pareto_concentration, q_part_supply_risk, q_partitioned_write_roundtrip,
    q_props_extract, q_q5_local_supplier, q_rank_fusion, q_schema_drift,
    q_score_calibrate, q_score_reliability, q_seasonal_backtest, q_shard_plan,
    q_ship_delay_stats, q_simhash_hamming_hist, q_simhash_idf, q_snm_pairs,
    q_span_intervals, q_t_closeness, q_token_quota, q_wau_rolling,
)
from .qflagship import (  # noqa: F401
    q_extract_grid_cards, q_extract_synthetic,
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
from .qgraph import (  # noqa: F401
    q_anchor_text, q_char_entropy, q_domain_reputation, q_external_link_ratio,
    q_global_rank, q_html_meta, q_jsonl_roundtrip, q_label_centroids,
    q_lang_id_multi, q_length_quantiles, q_link_distance, q_link_indegree,
    q_link_kcore, q_media_phash_pairs, q_outlinks, q_pagerank,
    q_reciprocal_links, q_robots_filter, q_snapshot_diff, q_snapshot_incremental,
    q_snapshot_latest, q_temporal_novelty, q_tfidf_cosine_pairs, q_trustrank,
    q_url_filter,
)
from .qmedia import (  # noqa: F401
    q_curate, q_curate_neardup, q_media_frames, q_sample_stratified,
    q_sample_systematic, q_top_terms,
)
from .qpii import (  # noqa: F401
    q_bitext_mine, q_leakage_free_split, q_pii_gate, q_pii_scan,
    q_pii_scrub,
)
from .qquality import (  # noqa: F401
    q_decontaminate, q_domain_quota, q_repetition_signals, q_word_stats,
)
from .qrelational import (  # noqa: F401
    q_approx_distinct, q_asof_join, q_asof_join_bucketed, q_distinct_events,
    q_event_lag, q_event_lag_bucketed, q_heavy_hitters, q_join_bucketed,
    q_join_large, q_join_revenue, q_media_meta, q_multihop_join,
    q_sessionize, q_sessionize_bucketed, q_skew_f2, q_sliding_window,
    q_topk_orders, q_window_hourly,
)
from .qsimilarity import (  # noqa: F401
    q_agg_lineitem, q_coverage_sample, q_dedup_semantic, q_embed_matryoshka,
    q_embed_pq, q_kcenter_sample, q_knn_brute, q_knn_graph,
    q_knn_ivf, q_knn_lsh,
)
from .qsnapshot import (  # noqa: F401
    q_build_postings, q_crawl_schedule, q_join_outer, q_link_density,
    q_quality_composite, q_snapshot_asof,
)
from .qtext import (  # noqa: F401
    q_doc_fingerprint, q_fingerprint, q_lang_id, q_normalize,
    q_pages_roundtrip, q_quality, q_rule_extract, q_token_count,
)
from .qtraining import (  # noqa: F401
    q_bm25_search, q_crawl_frontier, q_dsir_weights, q_embedding_outliers,
    q_split_assign, q_top_terms_by_lang,
)
from .qwarc import (  # noqa: F401
    q_bloom_dedup, q_bpe_encode, q_bpe_pairs, q_bpe_train,
    q_ccnet_buckets, q_cdx_index, q_warc_fetch, q_warc_roundtrip,
)


QUERIES = {
    "normalize_text": q_normalize,
    "pages_roundtrip": q_pages_roundtrip,
    "rule_extract": q_rule_extract,
    "pareto_concentration": q_pareto_concentration,
    "log_odds_terms": q_log_odds_terms,
    "ks_test": q_ks_test,
    "caps_ratio": q_caps_ratio,
    "gap_exponential_fit": q_gap_exponential_fit,
    "cdc_chunk_stats": q_cdc_chunk_stats,
    "canonical_extract": q_canonical_extract,
    "minhash_calibration": q_minhash_calibration,
    "token_quota": q_token_quota,
    "outline_depth_stats": q_outline_depth_stats,
    "simhash_idf": q_simhash_idf,
    "simhash_hamming_hist": q_simhash_hamming_hist,
    "fisher_dims": q_fisher_dims,
    "event_trigrams": q_event_trigrams,
    "brand_return_rates": q_brand_return_rates,
    "part_supply_risk": q_part_supply_risk,
    "ship_delay_stats": q_ship_delay_stats,
    "centroid_distances": q_centroid_distances,
    "schema_drift": q_schema_drift,
    "seasonal_backtest": q_seasonal_backtest,
    "props_extract": q_props_extract,
    "q5_local_supplier": q_q5_local_supplier,
    "cluster_chaining_audit": q_cluster_chaining_audit,
    "score_reliability": q_score_reliability,
    "df_stopwords": q_df_stopwords,
    "dup_rate_estimate": q_dup_rate_estimate,
    "consistent_hash_assign": q_consistent_hash_assign,
    "span_intervals": q_span_intervals,
    "partitioned_write_roundtrip": q_partitioned_write_roundtrip,
    "match_spans": q_match_spans,
    "merge_upserts": q_merge_upserts,
    "wau_rolling": q_wau_rolling,
    "hll_cumulative": q_hll_cumulative,
    "domain_pagerank": q_domain_pagerank,
    "graph_negative_edges": q_graph_negative_edges,
    "score_calibrate": q_score_calibrate,
    "equidepth_bins": q_equidepth_bins,
    "join_bloom_prefilter": q_join_bloom_prefilter,
    "entity_clusters": q_entity_clusters,
    "html_to_markdown": q_html_to_markdown,
    "t_closeness": q_t_closeness,
    "shard_plan": q_shard_plan,
    "date_extract": q_date_extract,
    "jsonld_extract": q_jsonld_extract,
    "contrastive_pairs": q_contrastive_pairs,
    "heading_outline": q_heading_outline,
    "html_tables": q_html_tables,
    "rank_fusion": q_rank_fusion,
    "join_outer": q_join_outer,
    "freq_itemsets": q_freq_itemsets,
    "approx_quantiles": q_approx_quantiles,
    "entity_resolve": q_entity_resolve,
    "snm_pairs": q_snm_pairs,
    "build_postings": q_build_postings,
    "link_density": q_link_density,
    "snapshot_asof": q_snapshot_asof,
    "crawl_schedule": q_crawl_schedule,
    "quality_composite": q_quality_composite,
    "pii_scan": q_pii_scan,
    "pii_scrub": q_pii_scrub,
    "pii_gate": q_pii_gate,
    "bitext_mine": q_bitext_mine,
    "leakage_free_split": q_leakage_free_split,
    "content_fingerprint": q_fingerprint,
    "token_count": q_token_count,
    "quality_score": q_quality,
    "lang_id": q_lang_id,
    "doc_fingerprint_rolling": q_doc_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_minhash_clusters": q_dedup_minhash_clusters,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_jaccard,
    "dedup_minhash_est": q_dedup_minhash_est,
    "setsim_join": q_setsim_join,
    "syndication_pairs": q_syndication_pairs,
    "embed_project": q_embed_project,
    "embed_quantize": q_embed_quantize,
    "ngram_novelty": q_ngram_novelty,
    "dedup_containment": q_dedup_containment,
    "dedup_keep_best": q_dedup_keep_best,
    "tfidf_top_terms": q_tfidf_top_terms,
    "inverted_index": q_inverted_index,
    "embedding_neardup": q_embedding_neardup,
    "knn_brute": q_knn_brute,
    "knn_ivf": q_knn_ivf,
    "knn_lsh": q_knn_lsh,
    "dedup_semantic": q_dedup_semantic,
    "agg_lineitem": q_agg_lineitem,
    "join_revenue": q_join_revenue,
    "join_large": q_join_large,
    "join_bucketed": q_join_bucketed,
    "multihop_join": q_multihop_join,
    "topk_orders": q_topk_orders,
    "distinct_events": q_distinct_events,
    "approx_distinct_kmv": q_approx_distinct,
    "skew_f2": q_skew_f2,
    "heavy_hitters": q_heavy_hitters,
    "cdc_dedup": q_cdc_dedup,
    "asof_join": q_asof_join,
    "asof_join_bucketed": q_asof_join_bucketed,
    "window_hourly": q_window_hourly,
    "window_sliding": q_sliding_window,
    "event_lag": q_event_lag,
    "event_lag_bucketed": q_event_lag_bucketed,
    "sessionize": q_sessionize,
    "sessionize_bucketed": q_sessionize_bucketed,
    "media_meta": q_media_meta,
    "curate_documents": q_curate,
    "curate_neardup": q_curate_neardup,
    "vocab_top_terms": q_top_terms,
    "sample_systematic": q_sample_systematic,
    "sample_stratified": q_sample_stratified,
    "media_frames": q_media_frames,
    "extract_synthetic": q_extract_synthetic,
    "extract_grid_cards": q_extract_grid_cards,
    "decontaminate": q_decontaminate,
    "quality_gopher": q_word_stats,
    "repetition_signals": q_repetition_signals,
    "domain_quota": q_domain_quota,
    "outlinks": q_outlinks,
    "link_indegree": q_link_indegree,
    "pagerank": q_pagerank,
    "reciprocal_links": q_reciprocal_links,
    "char_entropy": q_char_entropy,
    "anchor_text": q_anchor_text,
    "html_meta": q_html_meta,
    "snapshot_latest": q_snapshot_latest,
    "snapshot_diff": q_snapshot_diff,
    "snapshot_incremental": q_snapshot_incremental,
    "domain_reputation": q_domain_reputation,
    "url_filter": q_url_filter,
    "lang_id_multi": q_lang_id_multi,
    "decontaminate_semantic": q_decontaminate_semantic,
    "media_phash_pairs": q_media_phash_pairs,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "robots_filter": q_robots_filter,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "external_link_ratio": q_external_link_ratio,
    "length_quantiles": q_length_quantiles,
    "global_rank": q_global_rank,
    "label_centroids": q_label_centroids,
    "pii_redact": q_pii_redact,
    "line_dedup": q_line_dedup,
    "line_dedup_domain": q_line_dedup_domain,
    "clean_c4": q_clean_c4,
    "lm_score": q_lm_score,
    "lm_bigram": q_lm_bigram,
    "url_dedup": q_url_dedup,
    "chunk_windows": q_chunk_windows,
    "pack_sequences": q_pack_sequences,
    "bigram_topk": q_bigram_topk,
    "quality_tiers": q_quality_tiers,
    "domain_stats": q_domain_stats,
    "decontaminate_ngram": q_decontaminate_ngram,
    "mix_rebalance": q_mix_rebalance,
    "dedup_substring": q_dedup_substring,
    "build_training_set": q_build_training_set,
    "split_assign": q_split_assign,
    "bm25_search": q_bm25_search,
    "embedding_outliers": q_embedding_outliers,
    "dsir_weights": q_dsir_weights,
    "crawl_frontier": q_crawl_frontier,
    "top_terms_by_lang": q_top_terms_by_lang,
    "warc_roundtrip": q_warc_roundtrip,
    "cdx_index": q_cdx_index,
    "warc_fetch": q_warc_fetch,
    "bloom_dedup": q_bloom_dedup,
    "ccnet_buckets": q_ccnet_buckets,
    "bpe_pairs": q_bpe_pairs,
    "bpe_train": q_bpe_train,
    "sample_reservoir": q_sample_reservoir,
    "sample_weighted": q_sample_weighted,
    "sample_weighted_stratified": q_sample_weighted_stratified,
    "domain_dup_stats": q_domain_dup_stats,
    "funnel": q_funnel,
    "range_join": q_range_join,
    "range_join_bucketed": q_range_join_bucketed,
    "approx_distinct_hll": q_approx_distinct_hll,
    "hits_rank": q_hits_rank,
    "cohort_retention": q_cohort_retention,
    "session_stats": q_session_stats,
    "link_components": q_link_components,
    "mirror_domains": q_mirror_domains,
    "xlang_mine": q_xlang_mine,
    "topic_tag": q_topic_tag,
    "dedup_threshold_sweep": q_dedup_threshold_sweep,
    "graph_triangles": q_graph_triangles,
    "link_kcore": q_link_kcore,
    "link_distance": q_link_distance,
    "knn_graph": q_knn_graph,
    "kcenter_sample": q_kcenter_sample,
    "user_rfm": q_user_rfm,
    "lexical_diversity": q_lexical_diversity,
    "hapax_rate": q_hapax_rate,
    "scd2_intervals": q_scd2_intervals,
    "late_events": q_late_events,
    "collocations": q_collocations,
    "posting_gaps": q_posting_gaps,
    "quantiles_by_domain": q_quantiles_by_domain,
    "url_history": q_url_history,
    "url_templates": q_url_templates,
    "degree_distribution": q_degree_distribution,
    "top_docs_per_source": q_top_docs_per_source,
    "dedup_eval_lsh": q_dedup_eval_lsh,
    "dedup_eval_exact": q_dedup_eval_exact,
    "phrase_search": q_phrase_search,
    "pivot_events": q_pivot_events,
    "decayed_counts": q_decayed_counts,
    "rollup_source_lang": q_rollup_source_lang,
    "running_total": q_running_total,
    "key_skew": q_key_skew,
    "orders_without_lineitems": q_orders_without_lineitems,
    "global_quantiles": q_global_quantiles,
    "winsorize_lengths": q_winsorize,
    "hash_features": q_hash_features,
    "dau": q_dau,
    "cocitation": q_cocitation,
    "vocab_coverage": q_vocab_coverage,
    "mojibake": q_mojibake,
    "tokenizer_fertility": q_tokenizer_fertility,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "kmeans": q_kmeans,
    "cluster_sample": q_cluster_sample,
    "quality_logit": q_quality_logit,
    "filter_agreement": q_filter_agreement,
    "split_token_budget": q_split_token_budget,
    "redirects": q_redirects,
    "join_skewed": q_join_skewed,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_simhash_clusters": q_dedup_simhash_clusters,
    "dedup_cross_corpus": q_dedup_cross_corpus,
    "readability": q_readability,
    "script_mix": q_script_mix,
    "dom_templates": q_dom_templates,
    "bpe_encode": q_bpe_encode,
    "dedup_prefix": q_dedup_prefix,
    "trustrank": q_trustrank,
    "ann_recall": q_ann_recall,
    "event_transitions": q_event_transitions,
    "embed_standardize": q_embed_standardize,
    "embed_covariance": q_embed_covariance,
    "copy_search": q_copy_search,
    "signal_correlation": q_signal_correlation,
    "embed_pca": q_embed_pca,
    "join_storage_bucketed": q_join_storage_bucketed,
    "agg_incremental": q_agg_incremental,
    "domain_entropy": q_domain_entropy,
    "snapshot_editdist": q_snapshot_editdist,
    "domain_similarity": q_domain_similarity,
    "zipf_slope": q_zipf_slope,
    "first_seen": q_first_seen,
    "corpus_kl": q_corpus_kl,
    "session_paths": q_session_paths,
    "event_anomaly": q_event_anomaly,
    "audience_overlap": q_audience_overlap,
    "profile_table": q_profile_table,
    "k_anonymity": q_k_anonymity,
    "dedup_editdist": q_dedup_editdist,
    "dedup_phash_clusters": q_dedup_phash_clusters,
    "monthly_growth": q_monthly_growth,
    "lang_confusion": q_lang_confusion,
    "dedup_funnel": q_dedup_funnel,
    "embed_matryoshka": q_embed_matryoshka,
    "event_stationary": q_event_stationary,
    "event_entropy": q_event_entropy,
    "user_survival_curve": q_user_survival,
    "event_cusum": q_event_cusum,
    "embed_pq": q_embed_pq,
    "temporal_novelty": q_temporal_novelty,
    "coverage_sample": q_coverage_sample,
    "l_diversity": q_l_diversity,
    "markov_perplexity": q_markov_perplexity,
    "csv_roundtrip": q_csv_roundtrip,
    "event_gaps_hist": q_event_gaps_hist,
    "domain_gini": q_domain_gini,
    "ab_lift": q_ab_lift,
    "weekday_seasonality": q_weekday_seasonality,
    "graph_assortativity": q_graph_assortativity,
    "attribution_delay": q_attribution_delay,
    "label_prop": q_label_prop,
    "rowgroup_prune": q_rowgroup_prune,
    "event_burstiness": q_event_burstiness,
    "crawl_budget": q_crawl_budget,
    "length_lognormal": q_length_lognormal,
    "user_features": q_user_features,
    "ledger_drift": q_ledger_drift,
}





def embed_project_oracle_sql() -> str:
    comps = []
    for c in range(JL_OUT_DIMS):
        comps.append(
            f"""round(0.25 * list_sum(
        [(case when ('0x' || substr(md5('{c}|' || (d - 1)::varchar), 1, 15)
               )::ubigint % 2 = 1 then 1 else -1 end)
         * embedding[d]::double for d in range(1, {EMBED_DIMS + 1})]),
        6) as p{c}"""
        )
    return ("select vec_id, " + ",\n       ".join(comps)
            + " from embeddings")


def kcenter_oracle_sql() -> str:
    """Unrolled replay of the greedy selection: c0 = min vec_id; round k
    recomputes every point's max 4-dp cosine to centers c0..c(k-1) and
    picks the (msim asc, vec_id asc) minimum. All round CTEs are
    MATERIALIZED (each is referenced by every later round). The final
    select assigns each vector to its (sim desc, center id asc) nearest
    center."""
    rounds = []
    centers_union = "select * from c0"
    for k in range(1, KC_K):
        rounds.append(f"""
m{k} as materialized (
  select e.vec_id,
         max(round(list_cosine_similarity(e.embedding::double[],
             c.emb), 4)) as msim
  from embeddings e join ({centers_union}) c on e.vec_id <> -1
  where e.vec_id not in (select cid from ({centers_union}))
  group by e.vec_id),
c{k} as materialized (
  select m.vec_id as cid, e.embedding::double[] as emb
  from m{k} m join embeddings e using (vec_id)
  order by m.msim asc, m.vec_id asc limit 1)""")
        centers_union += f" union all select * from c{k}"
    return f"""
with c0 as materialized (
  select vec_id as cid, embedding::double[] as emb from embeddings
  order by vec_id limit 1),{",".join(rounds)},
centers as materialized ({centers_union}),
scored as (
  select e.vec_id, c.cid,
         round(list_cosine_similarity(e.embedding::double[], c.emb), 4)
           as sim
  from embeddings e cross join centers c),
ranked as (select *, row_number() over
             (partition by vec_id order by sim desc, cid asc) as rn
           from scored)
select vec_id, cid as center_id from ranked where rn = 1
"""


def coverage_oracle_sql() -> str:
    """Unrolled replay of the greedy cover: round k scores every
    not-yet-chosen doc by distinct tokens outside the covered set
    (anti-join), picks (n_new desc, doc_id asc) limit 1, extends the
    covered CTE. All rounds materialized; zero-gain rounds yield empty
    winner CTEs, matching the engine's early stop."""
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    rounds = []
    taken_union = "select doc_id from w0"
    cov_union = "select t from fl join w0 using (doc_id)"
    for k in range(1, COVER_K):
        rounds.append(f"""
s{k} as materialized (
  select f.doc_id, count(distinct f.t)::bigint as n_new
  from fl f
  where f.doc_id not in ({taken_union})
    and f.t not in (select t from ({cov_union}))
  group by f.doc_id),
w{k} as materialized (
  select doc_id, n_new from s{k}
  order by n_new desc, doc_id asc limit 1)""")
        taken_union += f" union all select doc_id from w{k}"
        cov_union += f" union select t from fl join w{k} using (doc_id)"
    winners = " union all ".join(
        f"select {k} as round, doc_id, n_new from w{k}"
        for k in range(COVER_K)
    )
    return f"""
with toks as (select doc_id, list_distinct({tokenize}) as tk
              from documents),
fl as materialized (select doc_id, unnest(tk) as t from toks),
w0 as materialized (
  select doc_id, count(distinct t)::bigint as n_new from fl
  group by doc_id order by n_new desc, doc_id asc limit 1),{",".join(rounds)},
wins as ({winners}),
cum as (
  select w.round, w.doc_id, w.n_new,
         sum(w.n_new) over (order by w.round
                            rows unbounded preceding) as covered_total
  from wins w)
select round::bigint as round, doc_id, n_new,
       covered_total::bigint as covered_total
from cum
"""


def pq_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the PQ encode: codebooks embedded as
    literals (deterministic, data-dependent — same composition contract
    as ivf_oracle_sql), assignment and reconstruction recomputed
    independently with the identical 6-dp distance round, id tie-break
    and left-to-right 4-dp error sum."""
    CB = _pq_codebooks(sf_dir)
    lits = ", ".join(
        f"({m}, {ci}, [{', '.join(repr(float(v)) for v in CB[m][ci])}]"
        f"::double[])"
        for m in range(PQ_M)
        for ci in range(CB.shape[1])
    )
    slices = ", ".join(
        f"({m}, {m * PQ_SUB + 1}, {(m + 1) * PQ_SUB})" for m in range(PQ_M)
    )
    picks = ", ".join(
        f"max(case when m = {m} then cid end)::bigint as c{m}"
        for m in range(PQ_M)
    )
    dists = ", ".join(
        f"max(case when m = {m} then dr end) as d{m}" for m in range(PQ_M)
    )
    return f"""
with cb(m, cid, cvec) as (values {lits}),
slices(m, lo, hi) as (values {slices}),
v as (select vec_id, embedding::double[] as vec from embeddings),
sub as (select v.vec_id, s.m, (v.vec[s.lo:s.hi])::double[] as sv
        from v cross join slices s),
d as (select sub.vec_id, sub.m, cb.cid,
             round(list_distance(sub.sv, cb.cvec), 6) as dr
      from sub join cb on cb.m = sub.m),
best as (select vec_id, m, cid, dr from (
    select *, row_number() over (partition by vec_id, m
                                 order by dr asc, cid asc) as rn
    from d) where rn = 1),
p as (select vec_id, {picks}, {dists} from best group by vec_id)
select vec_id, c0, c1, c2, c3,
       round(((d0 * d0 + d1 * d1) + d2 * d2) + d3 * d3, 4) as recon_err
from p
"""


def ivf_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the WHOLE IVF path for a given sf dir: the
    engine's (deterministic, first-512-row k-means) centroid matrix is
    embedded as float literals, and SQL independently recomputes the
    vector-to-bucket assignment (argmin squared L2, first-centroid
    tie-break), per-query probe set (2 nearest centroids to the
    normalized query), candidate filtering, cosine ranking (round 6) and
    top-5 with neighbor-id tie-break. Centroids depend on the data, so
    the SQL is composed per sf dir (all_oracles embeds the driver's
    sf0.01 tables); everything past the centroid literals is
    value-verified."""
    import pyarrow.parquet as pq_

    emb = _pq(sf_dir, "embeddings")
    cent_rows = _centroid_literals(sf_dir)
    t = pq_.read_table(emb, columns=["vec_id"])
    qids = ", ".join(
        str(i) for i in pc.take(
            t["vec_id"], pc.sort_indices(t["vec_id"])[:N_QUERIES]
        ).to_pylist()
    )
    return f"""
with cent(cid, cvec) as (values {cent_rows}),
v as (select vec_id, embedding::double[] as vec from embeddings),
assign as (
  select vec_id, vec, cid from (
    select v.vec_id, v.vec, c.cid,
           row_number() over (
             partition by v.vec_id
             order by list_distance(v.vec, c.cvec), c.cid) as rn
    from v cross join cent c) where rn = 1),
q as (
  select vec_id as query_id,
         list_transform(vec, x -> x / sqrt(list_sum(
             list_transform(vec, y -> y * y)))) as qn,
         vec as qraw
  from v where vec_id in ({qids})),
probes as (
  select query_id, cid from (
    select q.query_id, c.cid,
           row_number() over (
             partition by q.query_id
             order by list_distance(q.qn, c.cvec), c.cid) as rn
    from q cross join cent c) where rn <= 2),
cand as (
  select q.query_id, a.vec_id as neighbor_id,
         round(list_cosine_similarity(a.vec, q.qraw), 6) as sim
  from q join probes p using (query_id)
  join assign a on a.cid = p.cid),
ranked as (
  select *, row_number() over (
      partition by query_id order by sim desc, neighbor_id asc) as rn
  from cand)
select query_id, neighbor_id, sim from ranked where rn <= {KNN_K}
"""


def semdedup_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the WHOLE SemDeDup path: centroid literals
    (identical to the knn_ivf oracle's), argmin-L2 assignment with
    first-centroid tie-break, within-cluster pairwise cosine (round 6)
    and min-id-representative survivorship."""
    return f"""
with cent(cid, cvec) as (values {_centroid_literals(sf_dir)}),
v as (select vec_id, embedding::double[] as vec from embeddings),
assign as (
  select vec_id, vec, cid from (
    select v.vec_id, v.vec, c.cid,
           row_number() over (
             partition by v.vec_id
             order by list_distance(v.vec, c.cvec), c.cid) as rn
    from v cross join cent c) where rn = 1),
dropped as (
  select distinct b.vec_id
  from assign a join assign b on a.cid = b.cid and a.vec_id < b.vec_id
  where round(list_cosine_similarity(a.vec, b.vec), 6) >= {SEM_TAU})
select vec_id, cid as cluster from assign
where vec_id not in (select vec_id from dropped)
"""


def lsh_oracle_sql(sf_dir: str) -> str:
    """DuckDB replication of the WHOLE multi-table sign-LSH ANN path:
    every table's plane matrix (data-independent — dimension + fixed
    seeds) is embedded as float literals; SQL independently recomputes
    each vector's per-table sign signature (bit = round(v·hᵢ, 6) >= 0),
    each query's per-table multiprobe set (own bucket ∪ every 1-bit
    flip), the candidate UNION across tables, cosine ranking (round 6)
    and top-k with neighbor-id tie-break."""
    tables = sim.lsh_tables(_embedding_dim(sf_dir), LSH_TABLES, LSH_PLANES)
    plane_rows = ", ".join(
        f"({tid}, {pid}, [{', '.join(repr(float(v)) for v in row)}]::double[])"
        for tid, P in enumerate(tables)
        for pid, row in enumerate(P)
    )
    return f"""
with planes(tid, pid, pvec) as (values {plane_rows}),
v as (select vec_id, embedding::double[] as vec from embeddings),
sig as (
  select vec_id, vec, p.tid,
         sum(case when round(list_inner_product(vec, p.pvec), 6) >= 0
                  then (1::bigint << p.pid) else 0 end)::bigint as bucket
  from v cross join planes p group by vec_id, vec, p.tid),
qid as (select vec_id from v order by vec_id limit {N_QUERIES}),
q as (
  select vec_id as query_id, vec as qvec, tid, bucket as qb from sig
  where vec_id in (select vec_id from qid)),
probes as (
  select query_id, tid, qb as bucket from q
  union
  select q.query_id, q.tid, xor(q.qb, 1::bigint << p.pid) as bucket
  from q join planes p using (tid)),
cand as (
  select distinct q2.query_id, s.vec_id as neighbor_id,
         round(list_cosine_similarity(s.vec, q2.qvec), 6) as sim
  from (select distinct query_id, qvec from q) q2
  join probes pr using (query_id)
  join sig s on s.tid = pr.tid and s.bucket = pr.bucket),
ranked as (
  select *, row_number() over (
      partition by query_id order by sim desc, neighbor_id asc) as rn
  from cand)
select query_id, neighbor_id, sim from ranked where rn <= {KNN_K}
"""


def skew_f2_oracle_sql() -> str:
    from ..stages.sketch import AMS_GROUPS, AMS_K

    per = AMS_K // AMS_GROUPS
    return f"""
with js as (select unnest(range({AMS_K})) as j),
sg as (
  select j, sum(case when ('0x' || substr(md5(cast(user_id as varchar)
                                           || '|' || j::varchar), 1, 15)
                          )::ubigint % 2 = 1
                     then 1 else -1 end)::hugeint as s
  from events cross join js
  where user_id is not null
  group by j),
gm as (select j // {per} as g, avg((s*s)::double) as m from sg group by 1),
est as (select median(m)::double as est_f2 from gm),
ex as (select sum(c*c)::bigint as exact_f2 from (
    select count(*)::hugeint as c from events
    where user_id is not null group by user_id))
select {AMS_K}::bigint as k, round(est.est_f2, 6) as est_f2, ex.exact_f2,
       round(abs(est.est_f2 - ex.exact_f2) / ex.exact_f2, 6) as rel_err
from est, ex
"""


def _card_oracle_sql() -> str:
    _, exp_dir = card_corpus()
    return f"""
        select url, expected_json as extracted_json, 0 as n_missing
        from read_parquet('{exp_dir}/*.parquet')
    """


def _flagship_oracle_sql() -> str:
    """Reproduce the engine-side answer table from the generator's ground
    truth, independently of the extraction code path: the template
    fingerprint (md5 of the sorted '|'-joined anchor-label set,
    ``functions/templates.py:108-113``) is recomputed by DuckDB's own
    ``md5()`` over label-set string literals derived from the template
    registry — not from any engine-computed hash."""
    from ..functions.templates import TEMPLATE_FIELDS, field_label

    _, exp_dir = flagship_corpus()
    whens = " ".join(
        "when '{}' then substr(md5('{}'), 1, 16)".format(
            label, "|".join(sorted(field_label(f) for f in fields))
        )
        for label, fields in sorted(TEMPLATE_FIELDS.items())
    )
    return f"""
        select url,
               case label {whens} end as fingerprint,
               expected_norm_json as extracted_json,
               expected_text as text_norm,
               0 as n_missing
        from read_parquet('{exp_dir}/*.parquet')
    """


def external_link_ratio_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
e as (select src, dst,
             split_part(split_part(src, '://', 2), '/', 1) as sh,
             split_part(split_part(dst, '://', 2), '/', 1) as dh
      from l)
select src as url, count(*)::bigint as n_links,
       sum(case when dh <> sh then 1 else 0 end)::bigint as n_external,
       ((sum(case when dh <> sh then 1 else 0 end) * 1000000)
         // count(*))::bigint as ext_ppm
from e group by src
"""


def trustrank_oracle_sql(pages_dir: str, n: int = LINK_N) -> str:
    """Unrolled replay of q_trustrank: q_pagerank's oracle with the
    teleport terms gated on the seed indicator (page-number regexp) and
    normalized by the seed COUNT instead of n."""
    ns = len(range(0, n, TRUST_MOD))
    r0 = PR_SCALE // ns
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * ns)
    iters = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
r{k} as (
  select p.url,
         case when p.s = 1 then {base} else 0 end
           + ({PR_DAMP_NUM} * coalesce(sm.s, 0)) // {PR_DAMP_DEN} as r
  from seeds p left join (
    select e.dst as url, sum(rp.r // e.od)::bigint as s
    from edges e join {prev} rp on e.src = rp.url
    group by e.dst) sm using (url))""")
        prev = f"r{k}"
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
links as ({outlinks_oracle_sql(pages_dir)}),
outdeg as (select src, count(*)::bigint as od from links group by src),
edges as (select l.src, l.dst, o.od from links l join outdeg o using (src)),
pages as (select url from pages_raw),
seeds as (
  select url,
         case when regexp_extract(url, 'p(\\d+)$', 1)::int
                   % {TRUST_MOD} = 0
              then 1 else 0 end as s
  from pages),
r0 as (select url, case when s = 1 then {r0}::bigint else 0::bigint end
         as r from seeds),{",".join(iters)}
select url, r / {PR_SCALE}.0 as trustrank from {prev}
"""


def kcore_oracle_sql(pages_dir: str) -> str:
    """Unrolled replay of the peel: s_{k+1} keeps edges whose BOTH
    endpoints have degree >= K in s_k; KCORE_ROUNDS rounds, no-ops
    after the fixpoint. Every round CTE is MATERIALIZED — each
    references the previous one twice, so DuckDB's default inline
    expansion re-evaluates the chain exponentially (3^rounds)."""
    rounds = []
    prev = "s0"
    for k in range(1, KCORE_ROUNDS + 1):
        rounds.append(f"""
a{k} as materialized (
  select u from {prev} group by u having count(*) >= {KCORE_K}),
s{k} as materialized (
  select s.u, s.v from {prev} s
  join a{k} x on s.u = x.u join a{k} y on s.v = y.u)""")
        prev = f"s{k}"
    return f"""
with links as ({outlinks_oracle_sql(pages_dir)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from links where src <> dst),
s0 as (select a as u, b as v from und
       union all select b as u, a as v from und),{",".join(rounds)}
select u as url, count(*)::bigint as degree from {prev} group by u
"""


def linkdist_oracle_sql(pages_dir: str, n: int = LINK_N) -> str:
    """Walk-expansion replay: f_k = nodes reachable in exactly k steps
    (distinct per level); min level per node = BFS distance. Equivalent
    to the engine's pruned BFS because a node at distance d first
    appears at level d in both formulations. Level CTEs MATERIALIZED
    (each is referenced by the next level AND the final union — inline
    expansion would re-walk the whole chain per reference)."""
    levels = []
    union = ["select url, 0 as d from f0"]
    prev = "f0"
    for k in range(1, LINKDIST_MAX + 1):
        levels.append(f"""
f{k} as materialized (select distinct e.dst as url from e
         join {prev} on e.src = {prev}.url)""")
        union.append(f"select url, {k} as d from f{k}")
        prev = f"f{k}"
    return f"""
with links as ({outlinks_oracle_sql(pages_dir)}),
e as (select distinct src, dst from links where src <> dst),
pages as (select url from ({_link_pages_sql(pages_dir)})),
f0 as (select url from pages
       where regexp_extract(url, 'p(\\d+)$', 1)::int
             % {TRUST_MOD} = 0),{",".join(levels)},
lv as ({" union all ".join(union)})
select url, min(d)::bigint as dist from lv group by url
"""


def temporal_novelty_oracle_sql(pages_dir: str) -> str:
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with p as (select url, epoch_us(warc_ts) as us, text
           from read_parquet('{pages_dir}/*.parquet')),
toks as (select url, us, {tokenize} as toks from p),
sh as (
  select url, us,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
sd as (select url, us, list_distinct(shingles) as s from sh),
fl as (select us,
              (('0x' || substr(md5(unnest(s)), 1, 16))::ubigint::hugeint
               - 9223372036854775808)::bigint as h
       from sd),
own as (select h, min(us) as us from fl group by h),
nov as (select us, count(*)::bigint as n_novel from own group by us),
tot as (select url, us, len(s)::bigint as n_shingles from sd)
select t.url, t.us as ts_us, t.n_shingles,
       coalesce(nov.n_novel, 0)::bigint as n_novel,
       case when t.n_shingles > 0
            then (coalesce(nov.n_novel, 0) * 1000000) // t.n_shingles
            else 0 end::bigint as novelty_ppm
from tot t left join nov using (us)
"""


def snapshot_diff_oracle_sql(a_dir: str, b_dir: str) -> str:
    return f"""
select coalesce(a.url, b.url) as url,
       case when a.url is null then 'new'
            when b.url is null then 'gone'
            when a.text = b.text then 'unchanged'
            else 'changed' end as status
from read_parquet('{a_dir}/*.parquet') a
full outer join read_parquet('{b_dir}/*.parquet') b on a.url = b.url
"""


def bm25_oracle_sql() -> str:
    terms = list(BM25_TERMS)
    tf_cols = ",\n         ".join(
        f"sum(case when w = '{t}' then 1 else 0 end)::double as tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(case when tf{i} > 0 then 1 else 0 end)::double as df{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"ln((n.n - df.df{i} + 0.5) / (df.df{i} + 0.5) + 1.0)"
        f" * a.tf{i} * ({BM25_K1} + 1.0)"
        f" / (a.tf{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * a.dl"
        f" / av.avgdl))"
        for i in range(len(terms))
    )
    return f"""
with tok as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
n as (select count(*)::double as n from documents),
agg as (
  select doc_id, count(*)::double as dl,
         {tf_cols}
  from tok group by doc_id),
av as (select sum(dl) / (select n from n) as avgdl from agg),
df as (select {df_cols} from agg),
scored as (
  select a.doc_id, round({score_terms}, 6) as score
  from agg a, av, df, n)
select doc_id, score from scored
where score > 0.0
order by score desc, doc_id
limit {BM25_TOPK}
"""


def crawl_frontier_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
crawled as (select url from read_parquet('{pages_dir}/*.parquet')
            where regexp_extract(url, 'p(\\d+)$', 1)::int % 4 <> 3),
f as (
  select dst as url, count(*)::bigint as n_refs
  from l where dst not in (select url from crawled)
  group by dst),
s as (
  select url, split_part(split_part(url, '://', 2), '/', 1) as host,
         n_refs,
         row_number() over (
           partition by split_part(split_part(url, '://', 2), '/', 1)
           order by url) - 1 as slot
  from f)
select url, host, n_refs, slot::bigint as slot,
       (slot * {CRAWL_DELAY_S})::bigint as offset_s
from s
"""


def warc_oracle_sql(truth_dir: str) -> str:
    return f"""
select url, warc_date, status, n_bytes,
       coalesce(regexp_extract(text, '<title>(.*?)</title>', 1), '')
         as title
from read_parquet('{truth_dir}/*.parquet')
"""


def cdx_oracle_sql(truth_dir: str) -> str:
    return f"""
with t as (select * from read_parquet('{truth_dir}/*.parquet')),
s as (
  select *,
    split_part(url, '://', 2) as rest,
    regexp_replace(regexp_replace(
      lower(split_part(split_part(url, '://', 2), '/', 1)),
      ':[0-9]+$', ''), '^www\\.', '') as host
  from t)
select
  array_to_string(list_reverse(string_split(host, '.')), ',') || ')/'
    || (case when position('/' in rest) > 0
             then substr(rest, length(split_part(rest, '/', 1)) + 2)
             else '' end) as urlkey,
  regexp_replace(warc_date, '[^0-9]', '', 'g') as ts,
  url, md5(text) as digest, warc_file,
  "offset" as rec_offset, "length" as rec_length
from s
"""


def warc_fetch_oracle_sql(truth_dir: str) -> str:
    return f"""
select url, status, n_bytes, md5(text) as digest
from read_parquet('{truth_dir}/*.parquet')
where regexp_extract(url, 'page(\\d+)$', 1)::int % {WARC_FETCH_MOD} = 0
"""


def ccnet_oracle_sql() -> str:
    """Composed lazily: embeds the lm_score oracle (defined with the
    registry below) as the bits subquery."""
    return """
with s as (
  select l.doc_id, d.lang, l.lm_bits,
         floor(l.lm_bits * 100) / 100 as bq
  from (""" + ORACLES["lm_score"] + """) l
  join documents d using (doc_id)),
h as (select lang, bq, count(*)::bigint as n from s group by lang, bq),
c as (
  select lang, bq,
         sum(n) over (partition by lang order by bq) as cum,
         sum(n) over (partition by lang) as tot
  from h),
cuts as (
  select lang,
         min(case when cum >= ceil(tot / 3.0) then bq end) as c1,
         min(case when cum >= ceil(2 * tot / 3.0) then bq end) as c2
  from c group by lang)
select s.doc_id, s.lang, s.lm_bits,
       case when s.bq <= cuts.c1 then 'head'
            when s.bq <= cuts.c2 then 'middle'
            else 'tail' end as bucket
from s join cuts using (lang)
"""


def bpe_train_oracle_sql() -> str:
    """Unrolled replay of q_bpe_train's merge loop: the word-frequency
    table as wrapped-symbol strings ``(h)(i)(</w>)``; per round, pair
    counts by lateral position unnest, the (count desc, pair asc) top-1,
    and the wrapped string replace that equals the engine's
    left-to-right scan merge."""
    rounds = []
    prev = "w0"
    for k in range(1, BPE_MERGES + 1):
        rounds.append(f"""
p{k} as materialized (
  select s[i] || ' ' || s[i + 1] as pair, n
  from (
    select s, n, unnest(generate_series(1, len(s) - 1)) as i
    from (select string_split(substr(spaced, 2, length(spaced) - 2),
                              ')(') as s, n
          from {prev}))),
b{k} as materialized (
  select {k}::bigint as merge_idx,
         split_part(pair, ' ', 1) as left_sym,
         split_part(pair, ' ', 2) as right_sym, n
  from (select pair, sum(n)::bigint as n from p{k} group by pair
        order by n desc, pair limit 1)),
w{k} as materialized (
  select replace(spaced,
                 '(' || (select left_sym from b{k}) || ')(' ||
                 (select right_sym from b{k}) || ')',
                 '(' || (select left_sym from b{k}) ||
                 (select right_sym from b{k}) || ')') as spaced, n
  from {prev})""")
        prev = f"w{k}"
    union = "\nunion all\n".join(
        f"select merge_idx, left_sym, right_sym, left_sym || right_sym"
        f" as merged, n from b{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    return f"""
with words as (
  select w as word, count(*)::bigint as n
  from (select unnest(string_split(text, ' ')) as w from documents)
  where regexp_matches(w, '^[a-z]+$')
  group by w),
w0 as materialized (
  select '(' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substr(word, i, 1)), ')(')
         || ')(</w>)' as spaced, n
  from words),{",".join(rounds)}
{union}
"""


def hits_oracle_sql(pages_dir: str, iters: int = HITS_ITERS) -> str:
    """Unrolled replay of q_hits_rank's integer recurrence (the
    pagerank_oracle_sql pattern): same exact integer sums, the same
    ceil-divide rescale via greatest((max+S-1)//S, 1), ghost-zero
    semantics via coalesce over the full page list, ending in the
    identical int -> double divisions."""
    s = HITS_SCALE
    parts = []
    prev_h = "h0"
    for k in range(1, iters + 1):
        parts.append(f""",
a{k}raw as (
  select e.dst as url, sum(hp.v)::bigint as s
  from edges e join {prev_h} hp on e.src = hp.url group by e.dst),
a{k}q as (
  select greatest((max(s) + {s - 1}) // {s}, 1) as q from a{k}raw),
a{k} as (
  select p.url, coalesce(ar.s, 0) // (select q from a{k}q) as v
  from pages p left join a{k}raw ar using (url)),
h{k}raw as (
  select e.src as url, sum(ap.v)::bigint as s
  from edges e join a{k} ap on e.dst = ap.url group by e.src),
h{k}q as (
  select greatest((max(s) + {s - 1}) // {s}, 1) as q from h{k}raw),
h{k} as (
  select p.url, coalesce(hr.s, 0) // (select q from h{k}q) as v
  from pages p left join h{k}raw hr using (url))""")
        prev_h = f"h{k}"
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
links as ({outlinks_oracle_sql(pages_dir)}),
edges as (select src, dst from links),
pages as (select url from pages_raw),
h0 as (select url, {s}::bigint as v from pages){"".join(parts)}
select a{iters}.url, a{iters}.v / {s}.0 as authority,
       h{iters}.v / {s}.0 as hub
from a{iters} join h{iters} using (url)
"""


def dedup_eval_oracle_sql() -> str:
    """Replay of q_dedup_eval_lsh: the shared minhash CTE over the
    md5-sampled subset gives the candidate `pairs`; the exact truth is
    the same shingle-set Jaccard the dedup family defines (empty-set
    cases mirrored from dd.ngram_jaccard: both empty -> 1.0, one empty
    -> 0.0)."""
    body = _minhash_cte_body(source="s")
    return f"""
with s as (
  select doc_id, text from documents
  order by ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger,
           doc_id
  limit {DEDUP_EVAL_K}),
{body},
sd as (select doc_id, list_distinct(shingles) as sd from sh),
truth as (
  select x.doc_id as a, y.doc_id as b
  from sd x join sd y on x.doc_id < y.doc_id
  where case
          when len(x.sd) = 0 and len(y.sd) = 0 then 1.0
          when len(x.sd) = 0 or len(y.sd) = 0 then 0.0
          else len(list_intersect(x.sd, y.sd))::double /
               (len(x.sd) + len(y.sd) - len(list_intersect(x.sd, y.sd)))
        end >= 0.5),
tp as (select count(*)::bigint as n
       from pairs p join truth t on p.a = t.a and p.b = t.b),
np as (select count(*)::bigint as n from pairs),
nt as (select count(*)::bigint as n from truth)
select np.n as n_pred, nt.n as n_true, tp.n as tp,
       (case when np.n > 0 then tp.n * 1000000 // np.n
             else 0 end)::bigint as precision_ppm,
       (case when nt.n > 0 then tp.n * 1000000 // nt.n
             else 0 end)::bigint as recall_ppm
from np, nt, tp
"""


def url_history_oracle_sql(pages_dir: str) -> str:
    return f"""
select url, min(warc_ts) as first_ts, max(warc_ts) as last_ts,
       count(*)::bigint as n_captures,
       count(distinct coalesce(text, ''))::bigint as n_revisions,
       (case when count(*) > 1
             then (count(distinct coalesce(text, '')) - 1) * 1000000
                  // (count(*) - 1)
             else 0 end)::bigint as churn_ppm
from read_parquet('{pages_dir}/*.parquet')
group by url
"""


def degree_distribution_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
d as (select src, count(*)::bigint as out_degree from l group by src)
select out_degree, count(*)::bigint as n_pages from d group by out_degree
"""


def cocitation_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
d as (select distinct src, dst from l),
deg as (select src, count(*)::bigint as deg from d group by src),
p as (
  select x.dst as a, y.dst as b, 1000000 // dg.deg as w
  from d x join d y on x.src = y.src and x.dst < y.dst
  join deg dg on dg.src = x.src)
select a, b, count(*)::bigint as n_common, sum(w)::bigint as aa_ppm
from p group by a, b
having count(*) >= {COCITE_MIN_COMMON}
"""


def link_components_oracle_sql(pages_dir: str) -> str:
    """Replay of q_link_components: same md5-60-bit node ids, same
    intra-domain + known-target edge filter, self-loops for singletons,
    min-label components via the recursive-CTE idiom shared with the
    dedup_minhash_clusters oracle, then the two id->url joins."""
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
l as ({outlinks_oracle_sql(pages_dir)}),
h as (select url, ('0x' || substr(md5(url), 1, 15))::bigint as hid
      from pages_raw),
e0 as (
  select src, dst from l
  where src <> dst
    and split_part(split_part(src, '://', 2), '/', 1)
        = split_part(split_part(dst, '://', 2), '/', 1)),
eh as (select hs.hid as a, hd.hid as b
       from e0 join h hs on hs.url = e0.src
               join h hd on hd.url = e0.dst),
edges as (select a as src, b as dst from eh
          union select b, a from eh
          union select hid, hid from h),
comp as (
  select node, rep from (
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached)
    select node, min(reached) as rep from r group by node))
select hu.url, hr.url as component
from comp join h hu on hu.hid = comp.node
          join h hr on hr.hid = comp.rep
"""


def triangles_oracle_sql(pages_dir: str) -> str:
    return f"""
with l as ({outlinks_oracle_sql(pages_dir)}),
d as (select distinct src, dst from l where src <> dst),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from d)
select count(*)::bigint as n_triangles
from und e1
join und e2 on e2.a = e1.b
join und e3 on e3.a = e1.a and e3.b = e2.b
"""


def _hll_oracle_sql() -> str:
    """Replays the HLL sketch exactly in SQL: same 60-bit md5 hash, the
    leading-zero rank as an unrolled CASE over the 54-bit suffix, exact
    integer register sums, and the identical single double division (the
    numerator literal is repr'd from the engine's own constant)."""
    from ..stages import sketch as sk

    suffix = sk._HLL_SUFFIX_BITS
    cases = [f"when w = 0 then {suffix + 1}"]
    for k in range(suffix - 1, -1, -1):
        cases.append(f"when w >= {1 << k} then {suffix - k}")
    rank_case = "case " + " ".join(cases) + " end"
    num = repr(sk.HLL_NUM)
    return f"""
with h as (
  select distinct
    ('0x' || substr(md5(cast(event_id as varchar)), 1, 15))::ubigint::bigint
      as hv
  from events where event_id is not null),
rw as (select hv >> {suffix} as j,
              hv & {(1 << suffix) - 1} as w from h),
mr as (select j, max({rank_case}) as m_j from rw group by j),
regs as (
  select t.j, coalesce(mr.m_j, 0) as m_j
  from (select unnest(generate_series(0, {sk.HLL_M - 1})) as j) t
  left join mr using (j)),
s as (select sum(1::bigint << ({suffix + 1} - m_j))::bigint as s_scaled,
             sum(case when m_j = 0 then 1 else 0 end)::bigint as v_zero
      from regs)
select {sk.HLL_M}::bigint as m, v_zero, s_scaled,
       round(case when {num} / s_scaled <= {2.5 * sk.HLL_M}
                   and v_zero > 0
                  then {sk.HLL_M} * ln({sk.HLL_M}.0 / v_zero)
                  else {num} / s_scaled end, 6) as est_distinct
from s
"""


def mirror_domains_oracle_sql() -> str:
    """Replay of q_mirror_domains: syndication edges over the setsim
    pair CTE, md5-60 node ids, self-loops, min-label recursive-CTE
    components (the link_components idiom), id->name joins."""
    return f"""
with pr as ({_setsim_oracle_sql()}),
sy as (
  select least(da.source, db.source) as src_a,
         greatest(da.source, db.source) as src_b
  from pr
  join documents da on da.doc_id = pr.a
  join documents db on db.doc_id = pr.b),
srcs as (select distinct source from documents),
h as (select source, ('0x' || substr(md5(source), 1, 15))::bigint as hid
      from srcs),
e0 as (select distinct src_a, src_b from sy where src_a <> src_b),
eh as (select ha.hid as a, hb.hid as b
       from e0 join h ha on ha.source = e0.src_a
               join h hb on hb.source = e0.src_b),
edges as (select a as src, b as dst from eh
          union select b, a from eh
          union select hid, hid from h),
comp as (
  select node, rep from (
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached)
    select node, min(reached) as rep from r group by node))
select hu.source, hr.source as mirror_rep
from comp join h hu on hu.hid = comp.node
          join h hr on hr.hid = comp.rep
"""


def label_prop_oracle_sql(pages_dir: str) -> str:
    """Unrolled synchronous replay: round k joins the directed edge
    list with round k-1's labels and picks (count desc, label asc)
    per node. All rounds materialized."""
    rounds = []
    prev = "l0"
    for k in range(1, LP_ITERS + 1):
        rounds.append(f"""
l{k} as materialized (
  select v as node, lab from (
    select e.v, l.lab, count(*) as c,
           row_number() over (partition by e.v
                              order by count(*) desc, l.lab asc) as rn
    from dire e join {prev} l on l.node = e.u
    group by e.v, l.lab)
  where rn = 1)""")
        prev = f"l{k}"
    return f"""
with e as ({outlinks_oracle_sql(pages_dir)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from e where src <> dst),
dire as (select a as v, b as u from und
         union all select b, a from und),
l0 as materialized (select distinct v as node, v as lab from dire),{",".join(rounds)}
select node as url, lab as community from {prev}
"""


def scd2_oracle_sql(pages_dir: str) -> str:
    """Window replay: lag detects content changes, a running change-sum
    numbers the intervals, lead chains valid_to to the next interval's
    valid_from (NULL on the open one)."""
    return f"""
with s as (select url, warc_ts, md5(text) as h
           from read_parquet('{pages_dir}/*.parquet')),
c as (select *, case when lag(h) over
        (partition by url order by warc_ts) is distinct from h
        then 1 else 0 end as chg
      from s),
g as (select *, sum(chg) over (partition by url order by warc_ts
        rows unbounded preceding) as grp from c),
iv as (select url, grp, min(h) as content_md5,
              min(warc_ts) as valid_from,
              count(*)::bigint as n_captures
       from g group by url, grp)
select url, content_md5, valid_from,
       lead(valid_from) over (partition by url order by valid_from)
         as valid_to,
       n_captures
from iv
"""


def url_templates_oracle_sql(pages_dir: str) -> str:
    return f"""
with t as (
  select regexp_replace(regexp_replace(url, '=[^&#]*', '=V', 'g'),
                        '[0-9]+', 'N', 'g') as template,
         url, md5(coalesce(text, '')) as th
  from read_parquet('{pages_dir}/*.parquet')),
nu as (select template, count(distinct url)::bigint as n_urls
       from t group by 1),
nt as (select template, count(distinct th)::bigint as n_texts
       from t group by 1)
select nu.template, nu.n_urls, nt.n_texts,
       (nu.n_urls >= {TRAP_MIN_URLS}
        and nt.n_texts * {TRAP_DUP_FACTOR} <= nu.n_urls) as trap
from nu join nt using (template)
"""


def dedup_threshold_sweep_oracle_sql() -> str:
    """Replay of q_dedup_threshold_sweep: the dedup_eval sample + minhash
    CTE give the tau-independent candidate pairs; exact shingle-set
    (inter, union) per sample pair; per-tau truth by integer
    cross-multiply; left join keeps taus with zero true pairs."""
    body = _minhash_cte_body(source="s")
    tau_rows = ", ".join(f"({t})" for t in SWEEP_TAUS_1E4)
    return f"""
with s as (
  select doc_id, text from documents
  order by ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger,
           doc_id
  limit {DEDUP_EVAL_K}),
{body},
sd as (select doc_id, list_distinct(shingles) as sd from sh),
pj as (
  select x.doc_id as a, y.doc_id as b,
         len(list_intersect(x.sd, y.sd))::bigint as i,
         (len(x.sd) + len(y.sd)
          - len(list_intersect(x.sd, y.sd)))::bigint as u
  from sd x join sd y on x.doc_id < y.doc_id),
np as (select count(*)::bigint as n from pairs),
taus(tau) as (values {tau_rows}),
tr as (
  select taus.tau, pj.a, pj.b,
         exists (select 1 from pairs p
                 where p.a = pj.a and p.b = pj.b) as hit
  from taus join pj on (pj.u = 0 or pj.i * 10000 >= taus.tau * pj.u)),
agg as (
  select taus.tau, count(tr.a)::bigint as n_true,
         coalesce(sum(case when tr.hit then 1 else 0 end), 0)::bigint as tp
  from taus left join tr on tr.tau = taus.tau
  group by taus.tau)
select agg.tau as tau_1e4, np.n as n_pred, agg.n_true, agg.tp,
       (case when np.n > 0 then agg.tp * 1000000 // np.n
             else 0 end)::bigint as precision_ppm,
       (case when agg.n_true > 0 then agg.tp * 1000000 // agg.n_true
             else 0 end)::bigint as recall_ppm
from agg, np
"""


def phrase_search_oracle_sql() -> str:
    """Overlap-aware positional adjacency replayed as a DuckDB list
    comprehension over the tokenized text — one UNION ALL arm per query
    phrase (same single-space tokenization as the engine's split)."""
    arms = []
    for p in PHRASES:
        w1, w2, w3 = p.split()
        arms.append(f"""
select '{p}' as phrase, doc_id,
       len([i for i in range(1, len(toks) - 1)
            if toks[i] = '{w1}' and toks[i+1] = '{w2}'
            and toks[i+2] = '{w3}'])::bigint as n_occ
from t""")
    return (
        "with t as (select doc_id, string_split(coalesce(text, ''), ' ') "
        "as toks from documents)\nselect * from ("
        + " union all ".join(arms)
        + ") where n_occ > 0"
    )


def user_rfm_oracle_sql() -> str:
    """Replays the integer fold and the three exact-quartile cuts (the
    winsorize row_number order-statistic idiom, 0-based floor((n-1)q))."""
    stats = []
    for col in ("r_days", "f_n", "m_cents"):
        stats.append(f"""
s_{col} as (select {col} as v, row_number() over (order by {col}) - 1
              as r from u),
q_{col} as (select
  (select v from s_{col}, nn where r = ((nn.n - 1) * 1) // 4) as q1,
  (select v from s_{col}, nn where r = ((nn.n - 1) * 2) // 4) as q2,
  (select v from s_{col}, nn where r = ((nn.n - 1) * 3) // 4) as q3)""")
    return f"""
with ref as (select max(epoch_us(ts)) as us from events),
u as (select user_id,
             (ref.us - max(epoch_us(ts))) // {RFM_DAY_US} as r_days,
             count(*)::bigint as f_n,
             sum(floor(value * 100 + 0.5)::bigint)::bigint as m_cents
      from events, ref group by user_id, ref.us),
nn as (select count(*) as n from u),{",".join(stats)}
select u.user_id, u.r_days, u.f_n, u.m_cents,
       (1 + (u.r_days > q_r_days.q1)::int + (u.r_days > q_r_days.q2)::int
          + (u.r_days > q_r_days.q3)::int)::bigint as r_score,
       (1 + (u.f_n > q_f_n.q1)::int + (u.f_n > q_f_n.q2)::int
          + (u.f_n > q_f_n.q3)::int)::bigint as f_score,
       (1 + (u.m_cents > q_m_cents.q1)::int + (u.m_cents > q_m_cents.q2)::int
          + (u.m_cents > q_m_cents.q3)::int)::bigint as m_score
from u, q_r_days, q_f_n, q_m_cents
"""


def xlang_mine_oracle_sql() -> str:
    """Replay of q_xlang_mine: cosine at 4 dp scaled to bigint,
    rank by (sim desc, tgt_id asc), margin = K'*best - sum(top-K') in
    integer arithmetic, threshold inclusive."""
    return f"""
with tgt as (
  select e.vec_id as tid, e.embedding as te
  from embeddings e join documents d on d.doc_id = e.vec_id
  where d.lang = '{XLANG_TGT}'),
src as (
  select e.vec_id as sid, e.embedding as se
  from embeddings e join documents d on d.doc_id = e.vec_id
  where d.lang = '{XLANG_SRC}'),
scored as (
  select src.sid, tgt.tid,
         cast(round(round(list_cosine_similarity(src.se::double[],
              tgt.te::double[]), 4) * 10000, 0) as bigint) as s4
  from src cross join tgt),
ranked as (
  select *, row_number() over
      (partition by sid order by s4 desc, tid asc) as rn
  from scored),
agg as (
  select sid,
         max(case when rn = 1 then tid end) as tgt_id,
         max(case when rn = 1 then s4 end) as best_s4,
         count(*) as kk, sum(s4) as sum_s4
  from ranked where rn <= {XLANG_K} group by sid)
select sid as src_id, tgt_id, best_s4 as sim_1e4,
       cast(kk * best_s4 - sum_s4 as bigint) as margin_1e4
from agg where kk * best_s4 - sum_s4 >= {XLANG_TAU_1E4}
"""


def topic_tag_oracle_sql() -> str:
    lex_rows = ", ".join(
        f"('{w}', '{t}')"
        for t, ws in sorted(TOPIC_LEXICON.items())
        for w in ws
    )
    return f"""
with lex(word, topic) as (values {lex_rows}),
tok as (
  select doc_id, unnest(string_split(text, ' ')) as word from documents),
hits as (
  select t.doc_id, l.topic, count(*)::bigint as n
  from tok t join lex l on l.word = t.word
  group by t.doc_id, l.topic),
best as (
  select doc_id, topic, n, row_number() over
      (partition by doc_id order by n desc, topic asc) as rn
  from hits)
select d.doc_id,
       coalesce(b.topic, 'none') as topic,
       coalesce(b.n, 0) as hits
from documents d
left join best b on b.doc_id = d.doc_id and b.rn = 1
"""


def dom_templates_oracle_sql(pages_dir: str) -> str:
    return f"""
with tg as (
  select url,
         split_part(split_part(url, '://', 2), '/', 1) as host,
         md5(array_to_string(
           regexp_extract_all(decode(html), '<([a-z][a-z0-9]*)', 1),
           '>')) as struct_md5
  from ({_link_pages_sql(pages_dir)}))
select host, struct_md5, count(*)::bigint as n_pages,
       min(url) as sample_url
from tg group by host, struct_md5
"""


def ann_recall_oracle_sql(sf_dir: str) -> str:
    """Composes the two existing full replications (brute cosine top-K
    and the plane-literal sign-LSH path) and computes the same per-query
    hit rollup with a left join."""
    return f"""
with brute as ({ORACLES["knn_brute"]}),
ann as ({lsh_oracle_sql(sf_dir)})
select b.query_id,
       count(*)::bigint as k_truth,
       sum(case when a.neighbor_id is not null then 1 else 0 end)::bigint
         as n_hits,
       (sum(case when a.neighbor_id is not null then 1 else 0 end)
          * 1000000 // count(*))::bigint as recall_ppm
from brute b
left join ann a
  on a.query_id = b.query_id and a.neighbor_id = b.neighbor_id
group by b.query_id
"""


def bpe_encode_oracle_sql() -> str:
    """Replay of _bpe_learn + q_bpe_encode in SQL: the bpe_train oracle's
    unrolled merge rounds with the WORD carried through each round, a
    final per-word symbol count, and the per-doc rollup (left join: a
    word outside the trained ^[a-z]+$ class counts one token)."""
    rounds = []
    prev = "w0"
    for k in range(1, BPE_MERGES + 1):
        rounds.append(f"""
p{k} as materialized (
  select s[i] || ' ' || s[i + 1] as pair, n
  from (
    select s, n, unnest(generate_series(1, len(s) - 1)) as i
    from (select string_split(substr(spaced, 2, length(spaced) - 2),
                              ')(') as s, n
          from {prev}))),
b{k} as materialized (
  select split_part(pair, ' ', 1) as left_sym,
         split_part(pair, ' ', 2) as right_sym
  from (select pair, sum(n)::bigint as n from p{k} group by pair
        order by n desc, pair limit 1)),
w{k} as materialized (
  select word,
         replace(spaced,
                 '(' || (select left_sym from b{k}) || ')(' ||
                 (select right_sym from b{k}) || ')',
                 '(' || (select left_sym from b{k}) ||
                 (select right_sym from b{k}) || ')') as spaced, n
  from {prev})""")
        prev = f"w{k}"
    return f"""
with words as (
  select w as word, count(*)::bigint as n
  from (select unnest(string_split(text, ' ')) as w from documents)
  where regexp_matches(w, '^[a-z]+$')
  group by w),
w0 as materialized (
  select word, '(' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substr(word, i, 1)), ')(')
         || ')(</w>)' as spaced, n
  from words),{",".join(rounds)},
enc as (
  select word,
         len(string_split(substr(spaced, 2, length(spaced) - 2),
                          ')('))::bigint as n_sym
  from {prev}),
tok as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w
        from documents)
  where w <> '')
select t.doc_id, count(*)::bigint as n_words,
       sum(case when e.word is not null then e.n_sym else 1 end)::bigint
         as n_bpe_tokens
from tok t left join enc e on e.word = t.w
group by t.doc_id
"""


def event_stationary_oracle_sql() -> str:
    """Unrolled replay of the fixed-point power iteration (materialized
    round CTEs; the correlated per-state subquery runs over the tiny
    O(types²) transition table)."""
    rounds = []
    prev = "p0"
    for k in range(1, EV_STAT_ITERS + 1):
        rounds.append(f"""
p{k} as materialized (
  select s.t,
         coalesce((select sum((pp.p * tr.n) // tt.tot)
                   from tr join tot tt using (prev_type)
                   join {prev} pp on pp.t = tr.prev_type
                   where tr.next_type = s.t), 0)::bigint as p
  from states s)""")
        prev = f"p{k}"
    return f"""
with tr as materialized ({ORACLES["event_transitions"]}),
states as materialized (
  select prev_type as t from tr union select next_type from tr),
tot as materialized (
  select prev_type, sum(n)::bigint as tot from tr group by prev_type),
ns as (select count(*) as n from states),
p0 as (select t, ({EV_STAT_SCALE} // ns.n)::bigint as p
       from states, ns),{",".join(rounds)}
select t as event_type, (p // 1000000)::bigint as stationary_micro
from {prev}
"""


def event_entropy_oracle_sql() -> str:
    return f"""
with tr as ({ORACLES["event_transitions"]}),
tot as (select prev_type, sum(n)::bigint as tot from tr group by 1)
select t.prev_type, tot.tot as n_out,
       round(ln(tot.tot::double)
             - sum(t.n::double * ln(t.n::double)) / tot.tot::double, 6)
         as entropy_nats
from tr t join tot using (prev_type)
group by t.prev_type, tot.tot
"""


def assortativity_oracle_sql(pages_dir: str) -> str:
    return f"""
with e as ({outlinks_oracle_sql(pages_dir)}),
und as (select distinct least(src, dst) as a, greatest(src, dst) as b
        from e where src <> dst),
deg as (select node, count(*)::bigint as deg from (
          select a as node from und union all select b from und)
        group by node),
j as (select da.deg as x, db.deg as y
      from und join deg da on da.node = und.a
      join deg db on db.node = und.b),
m as (select (2 * count(*))::hugeint as m,
             (sum(x) + sum(y))::hugeint as sx,
             (sum(x * x) + sum(y * y))::hugeint as sxx,
             (2 * sum(x * y))::hugeint as sxy
      from j)
select (m // 2)::bigint as n_edges,
       case when m * sxx - sx * sx = 0 then 0.0
            else round((m * sxy - sx * sx)::double
                       / (m * sxx - sx * sx)::double, 6) end
         as assortativity
from m
"""


def pca_oracle_sql(sf_dir: str) -> str:
    """Composes the embed_pca oracle: recompute mean + top eigenvector
    INDEPENDENTLY (one-shot numpy over the raw parquet — no shared code
    path with the distributed reduction), embed them as 64 literal
    (pos, v, m) rows, and replay the projection in SQL."""
    import pyarrow.parquet as pq_

    X = np.asarray(
        pq_.read_table(_pq(sf_dir, "embeddings"), columns=["embedding"])[
            "embedding"
        ].to_pylist(),
        dtype=np.float64,
    )
    n = len(X)
    m = X.sum(axis=0) / n
    C = (X.T @ X) / n - np.outer(m, m)
    v = _pca_top_component(C)
    vals = ", ".join(
        f"({i + 1}, {v[i]!r}::double, {m[i]!r}::double)"
        for i in range(EMBED_DIMS)
    )
    return f"""
with w(pos, v, m) as (values {vals}),
flat as (
  select vec_id, unnest(embedding)::double as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings)
select f.vec_id, round(sum((f.val - w.m) * w.v), 6) as pc1
from flat f join w using (pos)
group by f.vec_id
"""


def first_seen_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url, warc_ts, md5(coalesce(text, '')) as fp
  from read_parquet('{pages_dir}/*.parquet')),
m as (select fp, min(warc_ts) as first_ts, count(*)::bigint as n_captures
      from p group by fp)
select m.fp, m.first_ts, min(p.url) as canonical_url, m.n_captures
from m join p on p.fp = m.fp and p.warc_ts = m.first_ts
group by m.fp, m.first_ts, m.n_captures
"""


def markov_perplexity_oracle_sql() -> str:
    return f"""
with tr as ({ORACLES["event_transitions"]}),
tot as (select prev_type, sum(n)::bigint as tot from tr group by 1),
w as (select user_id, event_type as b,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as a
      from events),
p as (select user_id, a, b, count(*)::bigint as c from w
      where a is not null group by 1, 2, 3),
j as (select p.user_id, p.c,
             ln(tot.tot::double) - ln(tr.n::double) as term
      from p join tr on tr.prev_type = p.a and tr.next_type = p.b
      join tot on tot.prev_type = p.a)
select user_id, sum(c)::bigint as n_transitions,
       round(sum(c * term), 6) as nll_nats,
       round(sum(c * term) / sum(c), 6) as avg_nll
from j group by user_id
"""


def rowgroup_prune_oracle_sql(path: str) -> str:
    return f"""
select row_group_id::bigint as row_group_id,
       row_group_num_rows::bigint as n_rows,
       stats_min_value::bigint as min_n_chars,
       stats_max_value::bigint as max_n_chars,
       (stats_max_value::bigint <= {PRUNE_NCHARS})::bigint as prunable
from parquet_metadata('{path}')
where path_in_schema = 'n_chars'
"""


def csv_roundtrip_oracle_sql(path: str) -> str:
    return f"""
select doc_id::bigint as doc_id, source, lang,
       n_chars::bigint as n_chars,
       (n_chars // 100)::bigint as len_bucket
from read_csv_auto('{path}', header=true)
"""


def pii_scan_oracle_sql(docs_dir: str) -> str:
    return f"""
select doc_id,
       length(regexp_extract_all(text, '{PII_EMAIL_RE}'))::bigint as n_email,
       length(regexp_extract_all(text, '{PII_PHONE_RE}'))::bigint as n_phone,
       length(regexp_extract_all(text, '{PII_IPV4_RE}'))::bigint as n_ipv4,
       length(regexp_extract_all(text, '{PII_SSN_RE}'))::bigint as n_ssn,
       (length(regexp_extract_all(text, '{PII_EMAIL_RE}'))
        + length(regexp_extract_all(text, '{PII_PHONE_RE}'))
        + length(regexp_extract_all(text, '{PII_IPV4_RE}'))
        + length(regexp_extract_all(text, '{PII_SSN_RE}')))::bigint as n_pii
from read_parquet('{docs_dir}/*.parquet')
"""


def pii_scrub_oracle_sql(docs_dir: str) -> str:
    return f"""
select doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g'),
             '{PII_SSN_RE}', '[SSN]', 'g'),
           '{PII_PHONE_RE}', '[PHONE]', 'g'),
         '{PII_IPV4_RE}', '[IP]', 'g') as text_redacted
from read_parquet('{docs_dir}/*.parquet')
"""


def pii_gate_oracle_sql(docs_dir: str) -> str:
    return f"""
select doc_id, text
from read_parquet('{docs_dir}/*.parquet')
where not regexp_matches(text, '{PII_EMAIL_RE}')
  and not regexp_matches(text, '{PII_PHONE_RE}')
  and not regexp_matches(text, '{PII_IPV4_RE}')
  and not regexp_matches(text, '{PII_SSN_RE}')
"""


def leakage_free_split_oracle_sql() -> str:
    return f"""
with pr as ({_setsim_oracle_sql()}),
sall as ({SPLIT_ASSIGN_SQL}),
s as (select doc_id, split from sall),
e as (select a as u, b as v from pr union select b, a from pr),
flag as (select distinct e.u as doc_id
         from e join s sv on sv.doc_id = e.v and sv.split = 'test')
select s.doc_id,
       case when s.split <> 'test' and f.doc_id is not null
            then 'dropped' else s.split end as split
from s left join flag f using (doc_id)
"""


def snapshot_asof_oracle_sql(pages_dir: str) -> str:
    return f"""
select url, warc_ts, text from (
  select url, warc_ts, text,
         row_number() over (partition by url
                            order by warc_ts desc) as rn
  from read_parquet('{pages_dir}/*.parquet')
  where warc_ts <= timestamp '{SNAPSHOT_ASOF_TS}')
where rn = 1
"""


def crawl_schedule_oracle_sql(pages_dir: str) -> str:
    return f"""
select host, url, rn as fetch_rank,
       (rn - 1) * {CRAWL_DELAY_S} as fetch_offset_s
from (
  select regexp_replace(url, '^https?://([^/]+)/.*$', '\\1') as host,
         url,
         row_number() over (
           partition by regexp_replace(url, '^https?://([^/]+)/.*$',
                                       '\\1')
           order by length(text) desc, url asc) as rn
  from read_parquet('{pages_dir}/*.parquet'))
"""


def link_density_oracle_sql(pages_dir: str) -> str:
    return f"""
with m as (
  select url,
         coalesce(list_sum(list_transform(
           regexp_extract_all(decode(html), '<p>([^<]*)</p>', 1),
           x -> length(x))), 0)::bigint as content_chars,
         coalesce(list_sum(list_transform(
           regexp_extract_all(decode(html),
                              '<a href="[^"]*">([^<]*)</a>', 1),
           x -> length(x))), 0)::bigint as anchor_chars
  from read_parquet('{pages_dir}/*.parquet'))
select url, content_chars, anchor_chars,
       case when content_chars + anchor_chars > 0
            then anchor_chars * 1000000
                 // (content_chars + anchor_chars)
            else 0 end as link_density_ppm,
       (case when content_chars + anchor_chars > 0
             then anchor_chars * 1000000
                  // (content_chars + anchor_chars)
             else 0 end >= {LINKDENS_BOILER_PPM})::bigint
         as is_boilerplate
from m
"""


def entity_resolve_oracle_sql(rec_dir: str) -> str:
    return f"""
with r as (
  select rec_id, lower(name) as nn, city, phone
  from read_parquet('{rec_dir}/*.parquet')),
b as (
  select rec_id, nn, phone, city || '|' || substr(nn, 1, 2) as bk from r)
select x.rec_id as a, y.rec_id as b,
       levenshtein(x.nn, y.nn)::bigint as dist,
       (x.phone = y.phone)::bigint as same_phone
from b x join b y on x.bk = y.bk and x.rec_id < y.rec_id
where levenshtein(x.nn, y.nn) <= {ER_MAX_DIST}
"""


def snm_pairs_oracle_sql(rec_dir: str) -> str:
    return f"""
with r as (
  select rec_id, lower(name) as nn from read_parquet('{rec_dir}/*.parquet')),
o as (
  select rec_id,
         row_number() over (order by nn, rec_id) - 1 as rnk
  from r)
select x.rec_id as a, y.rec_id as b, (y.rnk - x.rnk)::bigint as gap
from o x join o y
  on y.rnk - x.rnk between 1 and {SNM_WINDOW - 1}
"""


def heading_outline_oracle_sql(pages_dir: str) -> str:
    return f"""
with h as (
  select url,
         regexp_extract_all(decode(html), '<h([1-3])>', 1) as lvls,
         regexp_extract_all(decode(html),
                            '<h[1-3]>([^<]*)</h[1-3]>', 1) as txts
  from read_parquet('{pages_dir}/*.parquet'))
select url,
       generate_subscripts(lvls, 1)::bigint as pos,
       unnest(lvls)::bigint as level,
       unnest(txts) as heading
from h
"""


def html_tables_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url,
         regexp_extract_all(decode(html), '<tr>(.*?)</tr>', 1) as trs
  from read_parquet('{pages_dir}/*.parquet')),
r as (
  select url, generate_subscripts(trs, 1)::bigint as row_idx,
         unnest(trs) as tr
  from p),
x as (
  select url, row_idx,
         regexp_extract_all(tr, '<td>([^<]*)</td>', 1) as cells
  from r)
select url, row_idx,
       generate_subscripts(cells, 1)::bigint as col_idx,
       unnest(cells) as cell
from x
"""


def rank_fusion_oracle_sql() -> str:
    qual_sql = ORACLES["quality_score"]
    return f"""
with bm as ({bm25_oracle_sql()}),
bmr as (
  select doc_id, row_number() over (order by score desc, doc_id) as r
  from bm),
qall as ({qual_sql}),
qtop as (
  select doc_id, stop_ratio from qall
  order by stop_ratio desc, doc_id limit {BM25_TOPK}),
qr as (
  select doc_id,
         row_number() over (order by stop_ratio desc, doc_id) as r
  from qtop),
u as (
  select doc_id, 1000000 // ({RRF_K} + r) as c, r as rb, 0 as rq from bmr
  union all
  select doc_id, 1000000 // ({RRF_K} + r) as c, 0 as rb, r as rq from qr)
select doc_id, sum(c)::bigint as rrf_ppm,
       max(rb)::bigint as rank_bm25, max(rq)::bigint as rank_quality
from u group by doc_id
"""


def date_extract_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url, decode(html) as s
  from read_parquet('{pages_dir}/*.parquet')),
e as (
  select url,
    regexp_extract(s, 'Published: (\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) as iso,
    regexp_extract(s, 'Published: (\\d{{2}}/\\d{{2}}/\\d{{4}})', 1) as us,
    regexp_extract(s, 'Published: ([A-Z][a-z]+ \\d{{1,2}}, \\d{{4}})', 1)
      as tx
  from p),
d as (
  select url,
    case when iso <> '' then 'iso'
         when us <> '' then 'us'
         else 'text' end as fmt,
    case when iso <> '' then strptime(iso, '%Y-%m-%d')
         when us <> '' then strptime(us, '%m/%d/%Y')
         else strptime(tx, '%B %d, %Y') end as dt
  from e
  where iso <> '' or us <> '' or tx <> '')
select url, fmt, strftime(dt, '%Y-%m-%d') as date_iso,
       datediff('day', DATE '1970-01-01', dt::date)::bigint as epoch_day
from d
"""


def jsonld_extract_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url,
         regexp_extract(decode(html),
           '<script type="application/ld\\+json">(.*?)</script>', 1) as j
  from read_parquet('{pages_dir}/*.parquet'))
select url,
       json_extract_string(j, '$."@type"') as item_type,
       json_extract_string(j, '$.author') as author,
       json_extract(j, '$.wordCount')::bigint as word_count
from p where j <> ''
"""


def html_to_markdown_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (
  select url,
         regexp_extract_all(decode(html), '<(h1|h2|h3|p)>', 1) as tags,
         regexp_extract_all(decode(html),
                            '<(?:h1|h2|h3|p)>([^<]*)', 1) as txts
  from read_parquet('{pages_dir}/*.parquet')),
e as (
  select url, generate_subscripts(tags, 1)::bigint as pos,
         unnest(tags) as tag, unnest(txts) as txt
  from p)
select url, pos,
       case tag when 'h1' then '# ' || txt
                when 'h2' then '## ' || txt
                when 'h3' then '### ' || txt
                else txt end as md
from e
"""


def entity_clusters_oracle_sql(rec_dir: str) -> str:
    return f"""
with pairs as ({entity_resolve_oracle_sql(rec_dir)}),
edges as (select a as src, b as dst from pairs
          union select b, a from pairs)
select node as rec_id, rep_id from (
  with recursive cc(node, reached) as (
    select src, src from edges
    union
    select cc.node, e.dst from cc join edges e on e.src = cc.reached
  )
  select node, min(reached) as rep_id from cc group by node
)
"""


def domain_pagerank_oracle_sql(pages_dir: str) -> str:
    prev = "r0"
    rounds = []
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""
r{i} as (
  select d.d,
         {PR_SCALE}::hugeint * ({PR_DAMP_DEN} - {PR_DAMP_NUM})
           // ({PR_DAMP_DEN} * (select n from n))
         + {PR_DAMP_NUM} * coalesce((
             select sum({prev}.r * w.w // ws.tw)
             from w join {prev} on {prev}.d = w.sdom
                    join ws on ws.sdom = w.sdom
             where w.ddom = d.d), 0) // {PR_DAMP_DEN} as r
  from doms d)""")
        prev = f"r{i}"
    rounds_sql = ",".join(rounds)
    return f"""
with e as (
  select regexp_extract(src, 'https://([^/]+)/', 1) as sdom,
         regexp_extract(dst, 'https://([^/]+)/', 1) as ddom
  from ({outlinks_oracle_sql(pages_dir)})),
w as (select sdom, ddom, count(*)::hugeint as w from e group by 1, 2),
ws as (select sdom, sum(w)::hugeint as tw from w group by 1),
doms as (select distinct sdom as d from w
         union select distinct ddom from w),
n as (select count(*)::hugeint as n from doms),
r0 as (select d, {PR_SCALE}::hugeint // (select n from n) as r from doms),
{rounds_sql}
select d as domain, r::bigint as rank_e9 from {prev}
"""


def graph_negative_edges_oracle_sql(pages_dir: str) -> str:
    return f"""
with pages as (
  select cast(regexp_extract(url, 'p(\\d+)$', 1) as bigint) as i
  from read_parquet('{pages_dir}/*.parquet')),
edges as (
  select distinct
         cast(regexp_extract(src, 'p(\\d+)$', 1) as bigint) as a,
         cast(regexp_extract(dst, 'p(\\d+)$', 1) as bigint) as b
  from ({outlinks_oracle_sql(pages_dir)})),
cand as (
  select i, t, (i * 131 + t * 257 + 13) % {LINK_N} as j
  from pages cross join (select unnest(range({NEG_CAND_T})) as t)),
filt as (
  select i, j, min(t) as t from cand
  where j <> i and not exists
    (select 1 from edges e where e.a = cand.i and e.b = cand.j)
  group by i, j),
ranked as (
  select *, row_number() over (partition by i order by t) as rn
  from filt)
select i as src_id, j as neg_id, t::bigint as t
from ranked where rn <= {NEG_PER_NODE}
"""


def hll_cumulative_oracle_sql() -> str:
    from ..stages import sketch as sk

    suffix = sk._HLL_SUFFIX_BITS
    cases = [f"when w = 0 then {suffix + 1}"]
    for k in range(suffix - 1, -1, -1):
        cases.append(f"when w >= {1 << k} then {suffix - k}")
    rank_case = "case " + " ".join(cases) + " end"
    num = repr(sk.HLL_NUM)
    return f"""
with ev as (
  select distinct user_id, ts::date as day from events
  where user_id is not null),
days as (select distinct day from ev),
h as (
  select day,
    ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::ubigint::bigint
      as hv
  from ev),
rw as (select day, hv >> {suffix} as j,
              hv & {(1 << suffix) - 1} as w from h),
mr as (
  select d.day, rw.j, max({rank_case}) as m_j
  from days d join rw on rw.day <= d.day
  group by d.day, rw.j),
regs as (
  select d.day, t.j, coalesce(mr.m_j, 0) as m_j
  from days d
  cross join (select unnest(generate_series(0, {sk.HLL_M - 1})) as j) t
  left join mr on mr.day = d.day and mr.j = t.j),
s as (select day,
             sum(1::bigint << ({suffix + 1} - m_j))::bigint as s_scaled,
             sum(case when m_j = 0 then 1 else 0 end)::bigint as v_zero
      from regs group by day)
select strftime(day, '%Y-%m-%d') as day,
       round(case when {num} / s_scaled <= {2.5 * sk.HLL_M}
                   and v_zero > 0
                  then {sk.HLL_M} * ln({sk.HLL_M}.0 / v_zero)
                  else {num} / s_scaled end, 6) as est_users
from s
"""


def match_spans_oracle_sql() -> str:
    base = _rolling_oracle_sql()
    head = base[: base.index("fp as (")]
    return head + f"""
anchors as (
  select r.doc_id, r.t as pos, r.acc
  from r join s2 using (doc_id)
  where r.t >= s2.w and r.acc % {SPAN_DIV} = 0)
select xa.doc_id as a, xb.doc_id as b,
       xa.pos as a_pos, xb.pos as b_pos,
       xa.acc::bigint as anchor
from anchors xa
join anchors xb on xa.acc = xb.acc and xa.doc_id < xb.doc_id
"""


def span_intervals_oracle_sql() -> str:
    w = tx.CDC_WINDOW
    return f"""
with m as ({match_spans_oracle_sql()}),
o as (
  select a, b, a_pos, b_pos,
         case when a_pos - lag(a_pos) over win > {SPAN_GAP}
               or (a_pos - lag(a_pos) over win)
                  <> (b_pos - lag(b_pos) over win)
              then 1 else 0 end as brk
  from m
  window win as (partition by a, b order by a_pos, b_pos)),
i as (
  select *, sum(brk) over (partition by a, b order by a_pos, b_pos
                           rows unbounded preceding) as isl
  from o)
select a, b,
       (min(a_pos) - {w} + 1)::bigint as a_start,
       max(a_pos)::bigint as a_end,
       (min(b_pos) - {w} + 1)::bigint as b_start,
       max(b_pos)::bigint as b_end,
       count(*)::bigint as n_anchors
from i group by a, b, isl
"""


def dup_rate_oracle_sql() -> str:
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with smp as (
  select doc_id, text from documents
  order by md5(cast(doc_id as varchar)), doc_id
  limit {DUPRATE_SAMPLE_K}),
toks as (select doc_id, {tokenize} as toks from smp),
sh as (
  select doc_id,
         list_distinct(
           case when len(toks) >= 3 then
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' '
                                 || toks[i+2])
           when len(toks) >= 1 then [array_to_string(toks, ' ')]
           else [] end) as sd
  from toks),
p as (
  select x.doc_id as a, y.doc_id as b,
         round(len(list_intersect(x.sd, y.sd))::double /
               nullif(len(x.sd) + len(y.sd)
                      - len(list_intersect(x.sd, y.sd)), 0), 6) as j
  from sh x join sh y on x.doc_id < y.doc_id)
select count(*)::bigint as n_pairs,
       (select count(*) from smp)::bigint as n_sample,
       sum(case when j >= 0.5 then 1 else 0 end)::bigint as n_dup,
       (sum(case when j >= 0.5 then 1 else 0 end) * 1000000
        // count(*))::bigint as dup_rate_ppm
from p
"""


def score_reliability_oracle_sql() -> str:
    lg = ORACLES["quality_logit"]
    return f"""
with lg as ({lg}),
j as (
  select lg.doc_id, lg.logit_ppm,
         case when d.lang = 'en' then 1 else 0 end as is_en
  from lg join documents d using (doc_id)),
b as (
  select (logit_ppm + {RELIABILITY_OFFSET}) // {RELIABILITY_BIN_WIDTH}
           as bin,
         is_en
  from j)
select bin, count(*)::bigint as n, sum(is_en)::bigint as n_pos,
       (sum(is_en) * 1000000 // count(*))::bigint as pos_ppm
from b group by bin
"""


def schema_drift_oracle_sql(a_dir: str, b_dir: str) -> str:
    return f"""
with sa as (
  select name, type from parquet_schema('{a_dir}/*.parquet')
  where type is not null),
sb as (
  select name, type from parquet_schema('{b_dir}/*.parquet')
  where type is not null)
select coalesce(sa.name, sb.name) as column,
       coalesce(sa.type, '') as type_a,
       coalesce(sb.type, '') as type_b,
       case when sb.name is null then 'removed'
            when sa.name is null then 'added'
            when sa.type <> sb.type then 'type_changed'
            else 'unchanged' end as status
from sa full outer join sb on sa.name = sb.name
"""


def centroid_distances_oracle_sql() -> str:
    return f"""
with c as ({ORACLES["label_centroids"]}),
d as (
  select a.label as label_a, b.label as label_b,
         sum((a.value - b.value) * (a.value - b.value)) as ss
  from c a join c b on a.pos = b.pos and a.label < b.label
  group by 1, 2)
select label_a::bigint as label_a, label_b::bigint as label_b,
       round(sqrt(ss), 6) as dist
from d
"""


def simhash_idf_oracle_sql() -> str:
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with tk as (
  select doc_id, unnest({tokenize}) as t from documents),
dft as (select t, count(distinct doc_id)::bigint as df from tk group by t),
w as (
  select t,
         floor(ln((select count(*) from documents)::double / df) * 1000)
           ::bigint as wt
  from dft),
th as (
  select tk.doc_id,
         ('0x' || substr(md5(tk.t), 1, 16))::ubigint as h, w.wt
  from tk join w using (t)),
bitix(bit) as (select unnest(range(64))),
bits as (
  select doc_id, bit,
         sum(case when (h >> bit) & 1 = 1 then wt else -wt end) as acc
  from th cross join bitix group by doc_id, bit),
sim as (
  select doc_id,
         sum(case when acc > 0 then (1::hugeint << bit)
             else 0::hugeint end)::ubigint as simhash
  from bits group by doc_id)
select doc_id, simhash,
       ((simhash >> 0) & 65535)::bigint as band0,
       ((simhash >> 16) & 65535)::bigint as band1,
       ((simhash >> 32) & 65535)::bigint as band2,
       ((simhash >> 48) & 65535)::bigint as band3
from sim
"""


def token_quota_oracle_sql() -> str:
    qs = ORACLES["quality_score"]
    return f"""
with qs as ({qs}),
j as (
  select d.doc_id, d.source, qs.n_tokens,
         cast(round(qs.stop_ratio * 1000000) as bigint) as sr6
  from qs join documents d using (doc_id)),
c as (
  select *, sum(n_tokens) over (
      partition by source order by sr6 desc, doc_id
      rows unbounded preceding) as cum
  from j)
select doc_id, source, n_tokens, cum::bigint as cum_tokens
from c where cum <= {TOKEN_QUOTA_B}
"""


def outline_depth_oracle_sql(pages_dir: str) -> str:
    return f"""
with p as (select url, decode(html) as s
           from read_parquet('{pages_dir}/*.parquet'))
select url,
       length(s) - length(replace(s, '<h1>', '---'))::bigint as n_h1,
       length(s) - length(replace(s, '<h2>', '---'))::bigint as n_h2,
       length(s) - length(replace(s, '<h3>', '---'))::bigint as n_h3,
       case when contains(s, '<h3>') then 3
            when contains(s, '<h2>') then 2
            when contains(s, '<h1>') then 1
            else 0 end::bigint as max_level
from p
"""


def minhash_calibration_oracle_sql() -> str:
    return _minhash_cte() + f"""
, sd as (select doc_id, list_distinct(shingles) as sd from sh),
est as (
  select p.a, p.b,
         round(len([i for i in range(1, {dd.NUM_PERM} + 1)
                    if sa.sig[i] = sb.sig[i]])::double / {dd.NUM_PERM}, 6)
           as e
  from pairs p
  join sig sa on sa.doc_id = p.a
  join sig sb on sb.doc_id = p.b),
ex as (
  select p.a, p.b,
         round(len(list_intersect(xa.sd, xb.sd))::double /
               (len(xa.sd) + len(xb.sd)
                - len(list_intersect(xa.sd, xb.sd))), 6) as j
  from pairs p
  join sd xa on xa.doc_id = p.a
  join sd xb on xb.doc_id = p.b),
m as (
  select cast(floor(est.e * 10) as bigint) as bucket,
         cast(round(ex.j * 1000000) as bigint) as jppm
  from est join ex using (a, b))
select bucket, count(*)::bigint as n_pairs,
       (sum(jppm) // count(*))::bigint as mean_exact_ppm
from m group by bucket
"""


def canonical_extract_oracle_sql(pages_dir: str) -> str:
    return f"""
select url,
       regexp_extract(decode(html),
                      '<link rel="canonical" href="([^"]*)">', 1)
         as canonical_url,
       (url = regexp_extract(decode(html),
              '<link rel="canonical" href="([^"]*)">', 1))::bigint
         as is_self
from read_parquet('{pages_dir}/*.parquet')
"""


def cdc_chunk_stats_oracle_sql() -> str:
    base = _rolling_oracle_sql()
    head = base[: base.index("fp as (")]
    return head + f"""
cuts as (
  select r.doc_id, r.t
  from r join s2 using (doc_id)
  where r.t >= s2.w and r.acc % {tx.CDC_DIV} = 0
  union
  select doc_id, n from s2),
ch as (
  select doc_id, t as cut_end,
         lag(t, 1, 0) over (partition by doc_id order by t) as cut_start
  from cuts),
lens as (select cut_end - cut_start as l from ch),
o as (select l, row_number() over (order by l) - 1 as rn from lens),
agg as (select count(*)::bigint as n, sum(l)::bigint as total from lens)
select n as n_chunks, total as total_bytes,
       (total * 1000 // n)::bigint as mean_len_milli,
       (select l from o where rn = ((select n - 1 from agg) * 1) // 2)
         ::bigint as p50_len,
       (select l from o where rn = ((select n - 1 from agg) * 9) // 10)
         ::bigint as p90_len
from agg
"""


def log_odds_oracle_sql() -> str:
    a = LOGODDS_ALPHA
    return f"""
with f as (
  select source, text from documents
  where source in ('{KS_SRC_A}', '{KS_SRC_B}')),
tok as (
  select source, unnest(string_split(text, ' ')) as term from f),
c as (select source, term, count(*)::bigint as n
      from tok where term <> '' group by 1, 2),
p as (
  select term,
         coalesce(sum(case when source = '{KS_SRC_A}' then n end), 0)
           ::bigint as x1,
         coalesce(sum(case when source = '{KS_SRC_B}' then n end), 0)
           ::bigint as x2
  from c group by term),
tot as (
  select sum(x1)::double as n1, sum(x2)::double as n2,
         {a} * count(*)::double as a0
  from p),
z as (
  select p.term, p.x1, p.x2,
         round((ln((p.x1 + {a}) / (t.n1 + t.a0 - p.x1 - {a}))
                - ln((p.x2 + {a}) / (t.n2 + t.a0 - p.x2 - {a})))
               / sqrt(1.0 / (p.x1 + {a}) + 1.0 / (p.x2 + {a})), 6) as z
  from p, tot t),
r as (select *, row_number() over (order by abs(z) desc, term) as rn
      from z)
select term, x1 as n_a, x2 as n_b, z from r where rn <= {LOGODDS_TOP_K}
"""


def _norm_expr() -> str:
    return normalize_sql("text")


def _stop_count_sql() -> str:
    return " + ".join(
        f"length(regexp_extract_all(text, '\\b{w}\\b'))" for w in tx.STOPWORDS
    )


ORACLES: dict[str, str] = {
    "normalize_text": (
        f"select doc_id, {_norm_expr()} as text_norm from documents"
    ),
    "pages_roundtrip": (
        "select doc_id, "
        "case doc_id % 3 when 0 then 'text' when 1 then 'html' else 'pdf' end as kind, "
        f"{_norm_expr()} as text_norm from documents"
    ),
    "rule_extract": (
        "select event_id, regexp_extract(props, '\"k\":\\s*(\\d+)', 1) as k_value "
        "from events"
    ),
    "content_fingerprint": (
        "select doc_id, md5(coalesce(array_to_string(list_sort(list_distinct("
        "list_filter(string_split(text, ' '), x -> x in "
        "('spark','join','merge','window','stream','vector')))), '|'), '')) as fp "
        "from documents"
    ),
    "token_count": (
        "select doc_id, length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens "
        "from documents"
    ),
    "quality_score": (
        "select doc_id, length(text)::bigint as n_chars, "
        "length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens, "
        f"round(({_stop_count_sql()}) * 1.0 / "
        "greatest(length(regexp_extract_all(text, '\\S+')), 1), 6) as stop_ratio, "
        "round(length(regexp_extract_all(text, '[^\\w\\s]')) * 1.0 / "
        "greatest(length(text), 1), 6) as punct_ratio, "
        "round(length(text) * 1.0 / "
        "greatest(length(regexp_extract_all(text, '\\S+')), 1), 6) as mean_tok_len "
        "from documents"
    ),
    "lang_id": (
        f"select doc_id, case when ({_stop_count_sql()}) * 1.0 / "
        "greatest(length(regexp_extract_all(text, '\\S+')), 1) > 0.05 "
        "then 'en' else 'und' end as predicted_lang from documents"
    ),
    "dedup_exact": (
        "select md5(text) as content_md5, min(doc_id) as keep_doc_id, "
        "count(*) as n_copies from documents group by md5(text)"
    ),
    "embedding_neardup": (
        "select e1.vec_id as a, e2.vec_id as b "
        "from embeddings e1 join embeddings e2 "
        "on e1.label = e2.label and e1.vec_id < e2.vec_id "
        "where round(list_cosine_similarity(e1.embedding::double[], "
        "e2.embedding::double[]), 4) >= 0.35"
    ),

    "curate_documents": (
        """
        with feat as (
          select doc_id, text,
                 length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens,
                 (length(regexp_extract_all(text, '\\bthe\\b')) + length(regexp_extract_all(text, '\\ba\\b')) + length(regexp_extract_all(text, '\\bof\\b')) + length(regexp_extract_all(text, '\\band\\b')) + length(regexp_extract_all(text, '\\bto\\b')) + length(regexp_extract_all(text, '\\bin\\b')) + length(regexp_extract_all(text, '\\bis\\b')) + length(regexp_extract_all(text, '\\bit\\b'))) * 1.0 /
                   greatest(length(regexp_extract_all(text, '\\S+')), 1)
                   as stop_ratio_raw
          from documents),
        gated as (
          select doc_id, text, n_tokens from feat
          where n_tokens >= 20 and stop_ratio_raw > 0.05)
        select min(doc_id) as doc_id, min(n_tokens) as n_tokens
        from gated group by md5(text)
        """
    ),

    # fake decode = md5-derived metadata (stages/media.py:_fake_meta);
    # format keys off the first PAYLOAD BYTE (via to_hex(encode())), not
    # the first character, so non-ASCII text stays byte-exact
    "media_meta": (
        """
        select doc_id,
               64 + ('0x' || substr(md5(text), 1, 8))::uinteger % 1856
                 as width,
               64 + ('0x' || substr(md5(text), 9, 8))::uinteger % 1016
                 as height,
               case when octet_length(encode(text)) = 0 then 'jpeg'
                    else ['jpeg', 'png', 'webp']
                         [1 + ('0x' || substr(to_hex(encode(text)), 1, 2))::int % 3]
               end as format,
               octet_length(encode(text)) as n_bytes
        from documents
        """
    ),
    "sample_stratified": (
        """
        select doc_id, lang from documents
        where ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::uinteger
              % 1000
              < case when lang = 'en' then 200 else 600 end
        """
    ),
    "media_frames": (
        """
        with meta as (
          select doc_id, n_chars / 100.0 + 1.0 as duration_s, 30.0 as fps
          from documents),
        plan as (
          select doc_id, fps,
                 unnest(range(0, cast(floor(duration_s * fps) as bigint), 30))
                   as frame_idx
          from meta)
        select doc_id, frame_idx,
               cast(floor(frame_idx * 1000 / fps) as bigint) as ts_ms
        from plan
        """
    ),
    "vocab_top_terms": (
        """
        with t as (select unnest(string_split(text, ' ')) as term
                   from documents),
        c as (select term, count(*)::bigint as n from t
              where term <> '' group by term)
        select term, n from c order by n desc, term asc limit 50
        """
    ),
    "sample_systematic": (
        "select doc_id, n_chars from documents where doc_id % 8 = 0"
    ),
    "knn_brute": (
        # sims are ranked at 4 dp with vec_id tie-break on BOTH sides so
        # float32-vs-float64 cosine noise (~1e-8) cannot flip the result;
        # the similarity value itself is excluded from the hashed output.
        f"""
        with q as (select vec_id as qid, embedding as qe from embeddings
                   order by vec_id limit {N_QUERIES}),
        scored as (select q.qid, e.vec_id as nid,
                          round(list_cosine_similarity(q.qe::double[],
                                e.embedding::double[]), 4) as sim
                   from q cross join embeddings e),
        ranked as (select *, row_number() over
                     (partition by qid order by sim desc, nid asc) as rn
                   from scored)
        select qid as query_id, nid as neighbor_id
        from ranked where rn <= {KNN_K}
        """
    ),
    "knn_graph": KNNG_ORACLE_SQL,
    "kcenter_sample": kcenter_oracle_sql(),
    "user_rfm": user_rfm_oracle_sql(),
    "lexical_diversity": """
with t as (select doc_id, regexp_extract_all(text, '\\S+') as toks
           from documents)
select doc_id, length(toks)::bigint as n_tokens,
       length(list_distinct(toks))::bigint as n_types,
       (length(list_distinct(toks)) * 1000000 // length(toks))::bigint
         as ttr_ppm
from t where length(toks) > 0
""",
    "hapax_rate": """
with w as (select source, unnest(regexp_extract_all(text, '\\S+')) as word
           from documents),
tf as (select source, word, count(*) as n from w group by source, word)
select source, count(*)::bigint as n_vocab,
       sum((n = 1)::int)::bigint as n_hapax,
       (sum((n = 1)::int) * 1000000 // count(*))::bigint as hapax_ppm
from tf group by source
""",
    "late_events": """
with w as (select user_id, ts,
                  max(ts) over (partition by user_id order by event_id
                    rows between unbounded preceding and 1 preceding)
                    as wm
           from events)
select user_id, count(*)::bigint as n_events,
       coalesce(sum((ts < wm)::int), 0)::bigint as n_late,
       coalesce(max(case when ts < wm
                         then epoch_us(wm) - epoch_us(ts) end),
                0)::bigint as max_lateness_us
from w group by user_id
""",
    "agg_lineitem": (
        "select l_returnflag, l_linestatus, round(sum(l_quantity), 2) as sum_qty, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_revenue, "
        "round(avg(l_discount), 6) as avg_disc, count(*) as n "
        "from lineitem where l_shipdate < timestamp '1995-09-02' "
        "group by l_returnflag, l_linestatus"
    ),
    "join_revenue": (
        "select c_mktsegment, round(sum(o_totalprice), 2) as revenue, "
        "count(*) as n_orders from orders join customer on o_custkey = c_custkey "
        "group by c_mktsegment"
    ),

    "join_large": (
        "select o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue, "
        "count(*) as n_lineitems from orders join lineitem "
        "on o_orderkey = l_orderkey group by o_orderpriority"
    ),
    "join_bucketed": (
        "select o_orderpriority, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue, "
        "count(*) as n_lineitems from orders join lineitem "
        "on o_orderkey = l_orderkey group by o_orderpriority"
    ),
    "multihop_join": (
        "select r_name, count(*) as n_customers, "
        "round(sum(c_acctbal), 2) as total_acctbal "
        "from customer join nation on c_nationkey = n_nationkey "
        "join region on n_regionkey = r_regionkey group by r_name"
    ),
    "topk_orders": (
        "select o_orderkey, o_totalprice from orders "
        "order by o_totalprice desc, o_orderkey asc limit 10"
    ),
    "distinct_events": "select distinct event_type from events",
    "winsorize_lengths": """
with s as (select n_chars as v,
                  row_number() over (order by n_chars) - 1 as r
           from documents),
nn as (select count(*) as n from documents),
lo as (select v from s, nn where r = ((nn.n - 1) * 1) // 100),
hi as (select v from s, nn where r = ((nn.n - 1) * 99) // 100)
select d.doc_id, d.n_chars,
       least(greatest(d.n_chars, lo.v), hi.v) as clipped,
       (d.n_chars < lo.v or d.n_chars > hi.v) as was_clipped
from documents d, lo, hi
""",
    # exact integer step-decay replay: same epoch-us arithmetic, same
    # >> k right-shift weight, same 30-step clamp
    "decayed_counts": f"""
with m as (select max(epoch_us(ts)) as ref from events)
select event_type,
       sum(1000000 // (2 ** least((m.ref - epoch_us(ts))
                                  // {DECAY_HALFLIFE_US}, 30))::bigint)::bigint
         as decayed_micro,
       count(*)::bigint as n_events
from events, m
group by event_type
""",
    # replays the KMV bottom-k sketch exactly (stages/sketch.py): same
    # 60-bit md5-prefix hash, same k, same estimator arithmetic — an
    # approximate operator with an exact, value-verifying oracle
    "approx_distinct_kmv": """
with h as (
  select distinct
    ('0x' || substr(md5(cast(event_id as varchar)), 1, 15))::ubigint::bigint
      as hv
  from events where event_id is not null),
k as (select hv from h order by hv limit 256)
select count(*)::bigint as k, max(hv) as kth_h,
       round((count(*) - 1) * pow(2.0, 60) / max(hv), 6) as est_distinct
from k
""",
    "sample_reservoir": (
        f"select doc_id, md5(cast(doc_id as varchar)) as rk "
        f"from documents order by rk limit {RESERVOIR_K}"
    ),
    # replays the DLT priority-sampling arithmetic exactly: same 60-bit
    # md5-prefix hash, same integer (hv+1) before the double conversion
    # (converting then adding 1.0 can differ by an ulp at 2^60), same
    # single IEEE division and max-threshold estimator
    "sample_weighted": f"""
with pri as (
  select doc_id, n_chars,
         n_chars::double /
         ((('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::ubigint
           + 1)::double) as p
  from documents),
top as (select * from pri order by p desc, doc_id limit {SAMPLE_W_K + 1}),
tau as (select case when (select count(*) from top) > {SAMPLE_W_K}
                    then (select min(p) from top) else 0.0 end as t)
select doc_id, n_chars, round(p, 6) as pri,
       round(greatest(n_chars::double, (select t from tau)), 6) as est_w
from top
order by p desc, doc_id
limit {SAMPLE_W_K}
""",
    # per-stratum DLT replay: row_number within source, tau = the
    # (k+1)-th priority of the stratum (0 when the stratum is smaller)
    "sample_weighted_stratified": f"""
with pri as (
  select source, doc_id, n_chars,
         n_chars::double /
         ((('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::ubigint
           + 1)::double) as p
  from documents),
r as (select *, row_number() over (partition by source
                                   order by p desc, doc_id) as rn from pri),
tau as (select source,
               max(case when rn = {SAMPLE_WS_K + 1} then p else 0 end) as t
        from r group by source)
select r.source, doc_id, n_chars, round(p, 6) as pri,
       round(greatest(n_chars::double, tau.t), 6) as est_w
from r join tau using (source)
where rn <= {SAMPLE_WS_K}
""",
    "domain_dup_stats": """
with g as (
  select source, md5(coalesce(text, '')) as h, count(*)::bigint as c
  from documents group by 1, 2)
select source, sum(c)::bigint as n_docs, count(*)::bigint as n_unique,
       round(1.0 - count(*) * 1.0 / sum(c), 6) as dup_ratio
from g group by source
""",
    "funnel": """
with v as (select user_id, min(ts) as t_view
           from events where event_type = 'view' group by 1),
c as (select e.user_id, min(e.ts) as t_click
      from events e join v using (user_id)
      where e.event_type = 'click' and e.ts > v.t_view group by 1),
p as (select e.user_id, min(e.ts) as t_purchase
      from events e join c using (user_id)
      where e.event_type = 'purchase' and e.ts > c.t_click group by 1)
select u.user_id, v.t_view, c.t_click, p.t_purchase,
       (case when p.t_purchase is not null then 1 else 0 end)::bigint
         as completed
from (select distinct user_id from events) u
left join v using (user_id)
left join c using (user_id)
left join p using (user_id)
""",
    "range_join": f"""
select e.event_id, count(v.ts)::bigint as n_views_5m
from events e left join events v
  on v.user_id = e.user_id and v.event_type = 'view'
 and v.ts >= e.ts - interval {RANGE_WINDOW_S} second and v.ts < e.ts
group by e.event_id
""",
    # the bucketed decomposition is value-identical by construction;
    # same oracle as the plain operator
    "range_join_bucketed": f"""
select e.event_id, count(v.ts)::bigint as n_views_5m
from events e left join events v
  on v.user_id = e.user_id and v.event_type = 'view'
 and v.ts >= e.ts - interval {RANGE_WINDOW_S} second and v.ts < e.ts
group by e.event_id
""",
    "cohort_retention": """
with ud as (
  select distinct user_id, date_trunc('day', ts) as day from events),
c as (select user_id, min(day) as cohort_day from ud group by user_id)
select c.cohort_day,
       date_diff('day', c.cohort_day, ud.day)::bigint as day_offset,
       count(*)::bigint as n_users
from ud join c using (user_id)
group by 1, 2
""",
    "session_stats": f"""
with o as (
  select user_id, ts, event_id, event_type, value,
         case when lag(ts) over w is null
                or ts - lag(ts) over w > interval {SESSION_GAP_S} seconds
              then 1 else 0 end as new_s
  from events
  window w as (partition by user_id order by ts, event_id)),
s as (
  select *, sum(new_s) over (partition by user_id order by ts, event_id
                             rows unbounded preceding) as session_idx
  from o)
select user_id, session_idx::bigint as session_idx,
       count(*)::bigint as n_events,
       date_diff('microsecond', min(ts), max(ts))::bigint as duration_us,
       sum(case when event_type = 'purchase' then 1 else 0 end)::bigint
         as n_purchases,
       sum(floor(value * 1000000 + 0.5)::bigint)::bigint as revenue_micro
from s group by user_id, session_idx
""",
    "collocations": f"""
with tk as (select {dd.SQL_TOKENIZE.format(col="text")} as toks
            from documents),
big as (
  select split_part(p, ' ', 1) as w1, split_part(p, ' ', 2) as w2
  from (select unnest(case when len(toks) >= 2 then
                 list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i+1])
               else [] end) as p
        from tk)),
uni as (select unnest(toks) as w from tk),
cb as (select w1, w2, count(*)::bigint as c_ab from big group by 1, 2),
cu as (select w, count(*)::bigint as c from uni group by w),
tot as (select (select count(*)::bigint from uni) as n_tok,
               (select count(*)::bigint from big) as n_pairs)
select cb.w1, cb.w2, cb.c_ab, ca.c as c_a, cbb.c as c_b,
       round((cb.c_ab::double * tot.n_tok * tot.n_tok)
             / ((tot.n_pairs::double * ca.c) * cbb.c), 6) as lift
from cb
cross join tot
join cu ca on ca.w = cb.w1
join cu cbb on cbb.w = cb.w2
where cb.c_ab >= {COLLOC_MIN_COUNT}
""",
    "posting_gaps": """
with p as (
  select distinct doc_id, term
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '')
select term,
       row_number() over (partition by term order by doc_id)::bigint
         as idx,
       doc_id,
       (doc_id - coalesce(
          lag(doc_id) over (partition by term order by doc_id),
          0))::bigint as gap
from p
""",
    "quantiles_by_domain": """
with r as (select source, n_chars,
                  row_number() over (partition by source
                                     order by n_chars) as rn,
                  count(*) over (partition by source) as n
           from documents)
select source, max(n)::bigint as n_docs,
       max(case when rn = (n - 1) // 2 + 1 then n_chars end)::bigint
         as p50_chars,
       max(case when rn = ((n - 1) * 9) // 10 + 1 then n_chars end)::bigint
         as p90_chars
from r group by source
""",
    "top_docs_per_source": f"""
select source, doc_id, n_chars, rank from (
  select source, doc_id, n_chars,
         row_number() over (partition by source
                            order by n_chars desc, doc_id asc)::bigint
           as rank
  from documents)
where rank <= {TOP_DOCS_PER_SOURCE}
""",
    "pivot_events": """
select user_id,
       sum(case when event_type = 'view' then 1 else 0 end)::bigint
         as n_view,
       sum(case when event_type = 'click' then 1 else 0 end)::bigint
         as n_click,
       sum(case when event_type = 'purchase' then 1 else 0 end)::bigint
         as n_purchase,
       sum(floor(value * 1000000 + 0.5)::bigint)::bigint as value_micro
from events group by user_id
""",
    "rollup_source_lang": """
select source, lang, count(*)::bigint as n_docs,
       sum(n_chars)::bigint as sum_chars
from documents
group by rollup(source, lang)
""",
    "running_total": """
select event_id, user_id,
       row_number() over w::bigint as seq,
       sum(floor(value * 1000000 + 0.5)::bigint) over w::bigint
         as cum_value_micro
from events
window w as (partition by user_id order by ts, event_id
             rows unbounded preceding)
""",
    "key_skew": """
with c as (select user_id, count(*)::bigint as n from events
           group by user_id),
t as (select user_id, n from c order by n desc, user_id asc limit 1),
tot as (select sum(n)::bigint as n_rows, count(*)::bigint as n_keys
        from c)
select tot.n_rows, tot.n_keys, t.user_id as top_key, t.n as top_n,
       (t.n * 1000000 // tot.n_rows)::bigint as top_share_ppm
from tot, t
""",
    "orders_without_lineitems": """
select o_orderkey, o_custkey, o_totalprice from orders o
where not exists (select 1 from lineitem l
                  where l.l_orderkey = o.o_orderkey)
""",
    "global_quantiles": """
with r as (select n_chars,
                  row_number() over (order by n_chars) as rn,
                  count(*) over () as n
           from documents)
select max(n)::bigint as n_docs,
       max(case when rn = (n - 1) // 2 + 1 then n_chars end)::bigint
         as p50_chars,
       max(case when rn = ((n - 1) * 9) // 10 + 1 then n_chars end)::bigint
         as p90_chars,
       max(case when rn = ((n - 1) * 99) // 100 + 1 then n_chars
           end)::bigint as p99_chars
from r
""",
    "hash_features": f"""
with tri as (
  select doc_id, substr(text, i, 3) as g
  from documents, unnest(range(1, length(text) - 1)) as r(i))
select doc_id,
       (('0x' || substr(md5(g), 1, 8))::uinteger
        % {HASH_FEATURE_BUCKETS})::bigint as bucket,
       count(*)::bigint as n
from tri group by 1, 2
""",
    "quality_logit": f"""
with tri as (
  select doc_id, substr(text, i, 3) as g
  from documents, unnest(range(1, length(text) - 1)) as r(i)),
feats as (
  select doc_id,
         (('0x' || substr(md5(g), 1, 8))::uinteger
          % {HASH_FEATURE_BUCKETS})::bigint as bucket,
         count(*)::bigint as n
  from tri group by 1, 2),
w as (
  select b::bigint as bucket,
         ((('0x' || substr(md5(b::varchar), 1, 8))::uinteger
           % {LOGIT_WEIGHT_SPAN})::bigint - 500000) as w
  from unnest(range(0, {HASH_FEATURE_BUCKETS})) t(b)),
s as (
  select f.doc_id, (sum(f.n * w.w) // greatest(sum(f.n), 1))::bigint
           as logit_ppm
  from feats f join w using (bucket) group by f.doc_id)
select d.doc_id, coalesce(s.logit_ppm, 0)::bigint as logit_ppm,
       (case when coalesce(s.logit_ppm, 0) > 0 then 1 else 0 end)::bigint
         as keep
from documents d left join s using (doc_id)
""",
    "dau": """
with ud as (
  select distinct user_id, date_trunc('day', ts) as day from events),
f as (select user_id, min(day) as first_day from ud group by user_id)
select ud.day, count(*)::bigint as n_active,
       sum(case when ud.day = f.first_day then 1 else 0 end)::bigint
         as n_new
from ud join f using (user_id)
group by ud.day
""",
    "vocab_coverage": f"""
with t as (select unnest(string_split(text, ' ')) as term
           from documents),
c as (select term, count(*)::bigint as n from t
      where term <> '' group by term),
top as (select term, n from c order by n desc, term asc
        limit {VOCAB_TOP_K}),
tot as (select sum(n)::bigint as n_tokens from c),
iv as (select sum(n)::bigint as n_in,
              count(*)::bigint as vocab_size from top)
select tot.n_tokens, iv.n_in as n_in_vocab, iv.vocab_size,
       (iv.n_in * 1000000 // tot.n_tokens)::bigint as coverage_ppm
from tot, iv
""",
    "asof_join": (
        # not DuckDB's ASOF JOIN: with duplicate click timestamps ASOF
        # picks an arbitrary row among equal c_ts — this window form pins
        # the tie-break (max c_ts, then max c_id) to match the engine's
        # (ts, event_id)-sorted searchsorted exactly, data-independent
        """
        with clicks as (select user_id, ts as c_ts, event_id as c_id
                        from events where event_type = 'click'),
        best as (
          select event_id, c_id, c_ts from (
            select e.event_id, c.c_id, c.c_ts,
                   row_number() over (
                     partition by e.event_id
                     order by c.c_ts desc, c.c_id desc) as rn
            from events e join clicks c
              on e.user_id = c.user_id and e.ts > c.c_ts)
          where rn = 1)
        select e.event_id, b.c_id as prior_click_id,
               round(epoch(e.ts - b.c_ts), 6) as gap_s
        from events e left join best b using (event_id)
        """
    ),
    "window_hourly": (
        "select event_type, date_trunc('hour', ts) as hour, count(*) as n, "
        "round(sum(value), 2) as sum_value from events group by 1, 2"
    ),

    "window_sliding": (
        """
        with hourly as (
          select event_type, date_trunc('hour', ts) as hour,
                 count(*)::bigint as n, sum(value) as sv
          from events group by 1, 2),
        spans as (
          select event_type, min(hour) as h0, max(hour) as h1
          from hourly group by 1),
        grid as (
          select s.event_type, gs.h as window_start
          from spans s, lateral (
            select unnest(generate_series(s.h0, s.h1,
                                          interval 1 hour)) as h) gs),
        joined as (
          select g.event_type, g.window_start,
                 coalesce(h1.n, 0) + coalesce(h2.n, 0) as n,
                 round(coalesce(h1.sv, 0) + coalesce(h2.sv, 0), 2) as sum_value
          from grid g
          left join hourly h1 on h1.event_type = g.event_type
                             and h1.hour = g.window_start
          left join hourly h2 on h2.event_type = g.event_type
                             and h2.hour = g.window_start + interval 1 hour)
        select * from joined
        """
    ),
    "event_lag": (
        """
        select event_id, gap_us from (
          select event_id,
                 epoch_us(ts - lag(ts) over
                       (partition by user_id order by ts, event_id)) as gap_us
          from events) where gap_us is not null
        """
    ),
    "sessionize": (
        f"""
        with ordered as (
          select user_id, ts,
                 case when ts - lag(ts) over (partition by user_id order by ts)
                           > interval {SESSION_GAP_S} seconds
                      or lag(ts) over (partition by user_id order by ts) is null
                      then 1 else 0 end as new_session
          from events)
        select user_id, count(*)::bigint as n_events,
               sum(new_session)::bigint as n_sessions
        from ordered group by user_id
        """
    ),
}


# -- SQL re-implementations of the minhash / simhash family ----------------
# (appended to ORACLES: the whole LSH computation is md5 + mod-2^64
# arithmetic, so DuckDB reproduces it value-for-value)

def _minhash_cte_body(source: str = "documents") -> str:
    """The minhash/LSH CTE chain WITHOUT the leading `with`, over an
    arbitrary (doc_id, text) relation — composable after other CTEs."""
    perms = ", ".join(
        f"({i}, {a}::hugeint, {b}::hugeint)"
        for i, (a, b) in enumerate(zip(dd.PERM_A, dd.PERM_B))
    )
    rows_per_band = dd.NUM_PERM // dd.LSH_BANDS
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
toks as (
  select doc_id, {tokenize} as toks from {source}),
sh as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
shu as (select doc_id, unnest(shingles) as s from sh),
hv as (select doc_id,
              ('0x' || substr(md5(s), 1, 16))::ubigint as h from shu),
perms(p_idx, a, b) as (values {perms}),
pv as (
  select doc_id, p_idx,
         min(((a * h::hugeint + b) % 18446744073709551616::hugeint)::ubigint)
           as mh
  from hv cross join perms group by doc_id, p_idx),
sig as (select doc_id, list(mh order by p_idx) as sig from pv group by doc_id),
bandix(band_id) as (select unnest(range({dd.LSH_BANDS}))),
bands as (
  select doc_id, band_id,
         md5(array_to_string(
           list_slice(sig, band_id * {rows_per_band} + 1,
                      band_id * {rows_per_band} + {rows_per_band}), '|'))
           as band_hash
  from sig cross join bandix),
pairs as (
  select distinct x.doc_id as a, y.doc_id as b
  from bands x join bands y
    on x.band_id = y.band_id and x.band_hash = y.band_hash
   and x.doc_id < y.doc_id)
"""


def _minhash_cte() -> str:
    return "with " + _minhash_cte_body()


ORACLES["sessionize_bucketed"] = ORACLES["sessionize"]
ORACLES["asof_join_bucketed"] = ORACLES["asof_join"]
ORACLES["event_lag_bucketed"] = ORACLES["event_lag"]

ORACLES["dedup_minhash_lsh"] = _minhash_cte() + "select a, b from pairs"
ORACLES["dedup_eval_lsh"] = dedup_eval_oracle_sql()

ORACLES["curate_neardup"] = """
with feat as (
  select doc_id, text,
         length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens,
         (length(regexp_extract_all(text, '\\bthe\\b')) + length(regexp_extract_all(text, '\\ba\\b')) + length(regexp_extract_all(text, '\\bof\\b')) + length(regexp_extract_all(text, '\\band\\b')) + length(regexp_extract_all(text, '\\bto\\b')) + length(regexp_extract_all(text, '\\bin\\b')) + length(regexp_extract_all(text, '\\bis\\b')) + length(regexp_extract_all(text, '\\bit\\b'))) * 1.0 /
           greatest(length(regexp_extract_all(text, '\\S+')), 1)
           as stop_ratio_raw
  from documents),
gated as (
  select doc_id, text, n_tokens from feat
  where n_tokens >= 20 and stop_ratio_raw > 0.05),
surv as (
  select min(doc_id) as doc_id, min(n_tokens) as n_tokens
  from gated group by md5(text)),
survtext as (
  select s.doc_id, s.n_tokens, d.text
  from surv s join documents d using (doc_id)),
""" + _minhash_cte_body("survtext") + """,
sd as (select doc_id, list_distinct(shingles) as sd from sh),
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
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached
    )
    select node, min(reached) as rep_id from r group by node
  )),
losers as (
  select doc_id from (
    select c.node as doc_id,
           row_number() over (partition by c.rep_id
                              order by s.n_tokens desc, c.node asc) as rn
    from comp c join surv s on s.doc_id = c.node)
  where rn > 1)
select s.doc_id, s.n_tokens from surv s
where s.doc_id not in (select doc_id from losers)
"""


ORACLES["dedup_ngram_jaccard"] = _minhash_cte() + """
, sd as (select doc_id, list_distinct(shingles) as sd from sh)
select p.a, p.b,
       round(len(list_intersect(xa.sd, xb.sd))::double /
             (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
             6) as jaccard
from pairs p
join sd xa on xa.doc_id = p.a
join sd xb on xb.doc_id = p.b
"""

# Exact relational all-pairs Jaccard (pairs sharing >= 1 shingle — for
# tau > 0 that IS every qualifying pair): the oracle does NOT replicate
# the prefix filter, so a green hash check proves the engine's prefix
# pruning has no false negatives on the data (AllPairs lemma, see
# stages/setsim.py). Intersections come from an exploded equijoin +
# group-count — no per-pair list_intersect.
def _setsim_oracle_sql() -> str:
    from ..stages.setsim import SETSIM_TAU

    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with toks as (
  select doc_id, {tokenize} as toks from documents),
shl as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
tok as (select distinct doc_id, unnest(shingles) as s from shl),
sz as (select doc_id, count(*)::bigint as n from tok group by 1),
inter as (
  select a.doc_id as a, b.doc_id as b, count(*)::bigint as c
  from tok a join tok b on a.s = b.s and a.doc_id < b.doc_id
  group by 1, 2)
select i.a, i.b,
       round(c::double / (sa.n + sb.n - c), 6) as jaccard
from inter i
join sz sa on sa.doc_id = i.a
join sz sb on sb.doc_id = i.b
where round(c::double / (sa.n + sb.n - c), 6) >= {SETSIM_TAU}
"""


ORACLES["setsim_join"] = _setsim_oracle_sql()

# same tokenize/shingle CTEs; df over the distinct (doc, shingle) rows
ORACLES["ngram_novelty"] = f"""
with toks as (
  select doc_id, {dd.SQL_TOKENIZE.format(col="text")} as toks
  from documents),
shl as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
tok as (select distinct doc_id, unnest(shingles) as s from shl),
dfc as (select s, count(*)::bigint as df from tok group by 1)
select t.doc_id, count(*)::bigint as n_shingles,
       count(*) filter (dfc.df = 1)::bigint as n_unique,
       round((count(*) filter (dfc.df = 1))::double / count(*), 6)
         as novelty
from tok t join dfc on dfc.s = t.s
group by t.doc_id
"""

ORACLES["syndication_pairs"] = f"""
with pr as ({_setsim_oracle_sql()})
select least(da.source, db.source) as src_a,
       greatest(da.source, db.source) as src_b,
       count(*)::bigint as n_pairs
from pr
join documents da on da.doc_id = pr.a
join documents db on db.doc_id = pr.b
group by 1, 2
"""

ORACLES["dedup_eval_exact"] = f"""
with pred as ({_minhash_cte()} select a, b from pairs),
tr as ({_setsim_oracle_sql()}),
m as (select (select count(*) from pred)::bigint as n_pred,
             (select count(*) from tr)::bigint as n_true,
             (select count(*) from pred join tr using (a, b))::bigint as tp)
select n_pred, n_true, tp,
       (case when n_pred > 0 then tp * 1000000 // n_pred
             else 0 end)::bigint as precision_ppm,
       (case when n_true > 0 then tp * 1000000 // n_true
             else 0 end)::bigint as recall_ppm
from m
"""

ORACLES["phrase_search"] = phrase_search_oracle_sql()

ORACLES["embed_project"] = embed_project_oracle_sql()

ORACLES["embed_quantize"] = EMBED_QUANTIZE_SQL

ORACLES["mirror_domains"] = mirror_domains_oracle_sql()

ORACLES["xlang_mine"] = xlang_mine_oracle_sql()

ORACLES["topic_tag"] = topic_tag_oracle_sql()

ORACLES["dedup_threshold_sweep"] = dedup_threshold_sweep_oracle_sql()

ORACLES["dedup_minhash_est"] = _minhash_cte() + f"""
select p.a, p.b,
       round(len([i for i in range(1, {dd.NUM_PERM} + 1)
                  if sa.sig[i] = sb.sig[i]])::double / {dd.NUM_PERM}, 6)
         as est_jaccard
from pairs p
join sig sa on sa.doc_id = p.a
join sig sb on sb.doc_id = p.b
"""

ORACLES["dedup_containment"] = _minhash_cte() + """
, sd as (select doc_id, list_distinct(shingles) as sd from sh)
select p.a, p.b,
       case when len(xa.sd) = 0 then 1.0
            else round(len(list_intersect(xa.sd, xb.sd))::double
                       / len(xa.sd), 6) end as cont_a_in_b,
       case when len(xb.sd) = 0 then 1.0
            else round(len(list_intersect(xa.sd, xb.sd))::double
                       / len(xb.sd), 6) end as cont_b_in_a
from pairs p
join sd xa on xa.doc_id = p.a
join sd xb on xb.doc_id = p.b
"""

# Rolling-hash winnowing fingerprint, emulated exactly in SQL: the engine
# computes h_i over 16-byte windows in numpy uint64 (wrap mod 2^64, then
# mask to 61 bits each step, stages/text.py:106-127); the oracle replays
# the identical recurrence per byte in an iterative CTE over HUGEINT with
# explicit positive-mod arithmetic, reading bytes from to_hex(encode()).
# The B^(w-1) table is computed here in pure Python int arithmetic.
def _rolling_oracle_sql() -> str:
    def bw_of(w: int) -> int:
        bw = 1
        for _ in range(w - 1):
            bw = ((bw * 1000003) % 2**64) % 2**61
        return bw

    bws = ", ".join(f"({w}, {bw_of(w)}::hugeint)" for w in range(1, 17))
    m64 = 18446744073709551616
    mask = 2305843009213693952
    return f"""
with src as (
  select doc_id, to_hex(encode(text)) as hx,
         octet_length(encode(text)) as n,
         least(16, octet_length(encode(text))) as w
  from documents),
bws(w, bw) as (values {bws}),
s2 as (select src.*, bws.bw from src join bws using (w) where n > 0),
r as (
  with recursive rr(doc_id, t, acc) as (
    select doc_id, 1,
           ('0x' || substr(hx, 1, 2))::ubigint::hugeint % {mask}
    from s2
    union all
    select rr.doc_id, rr.t + 1,
      case when rr.t + 1 <= s2.w then
        ((rr.acc * 1000003
          + ('0x' || substr(s2.hx, 2*(rr.t+1)-1, 2))::ubigint::hugeint)
          % {m64}) % {mask}
      else
        (((((rr.acc
             - ('0x' || substr(s2.hx, 2*(rr.t+1-s2.w)-1, 2))::ubigint::hugeint
               * s2.bw)
            * 1000003
            + ('0x' || substr(s2.hx, 2*(rr.t+1)-1, 2))::ubigint::hugeint)
           % {m64}) + {m64}) % {m64}) % {mask}
      end
    from rr join s2 using (doc_id) where rr.t < s2.n
  ) select * from rr
),
fp as (
  select r.doc_id, min(r.acc)::bigint as fingerprint64
  from r join s2 using (doc_id) where r.t >= s2.w group by r.doc_id)
select d.doc_id, coalesce(fp.fingerprint64, 0) as fingerprint64
from documents d left join fp using (doc_id)
"""


ORACLES["doc_fingerprint_rolling"] = _rolling_oracle_sql()


def _cdc_oracle_sql() -> str:
    """CDC chunk dedup replayed exactly in SQL: the SAME iterative
    HUGEINT rolling-hash CTE as the winnowing oracle (the two operators
    share one recurrence by construction — ``_rolling_accs``), then cut
    positions where acc % CDC_DIV = 0 (t >= window) plus the forced
    end-of-doc cut, chunks as hex substrings between consecutive cuts,
    chunk identity = md5 of the UPPERCASE hex (DuckDB ``to_hex``), and
    the same per-doc dup fold as the Ray dataflow."""
    base = _rolling_oracle_sql()
    head = base[: base.index("fp as (")]
    return head + f"""
cuts as (
  select r.doc_id, r.t
  from r join s2 using (doc_id)
  where r.t >= s2.w and r.acc % {tx.CDC_DIV} = 0
  union
  select doc_id, n from s2),
ch as (
  select doc_id, t as cut_end,
         lag(t, 1, 0) over (partition by doc_id order by t) as cut_start
  from cuts),
chunks as (
  select ch.doc_id,
         md5(substr(s2.hx, 2 * ch.cut_start + 1,
                    2 * (ch.cut_end - ch.cut_start))) as ck,
         ch.cut_end - ch.cut_start as clen
  from ch join s2 using (doc_id)),
freq as (select ck, count(distinct doc_id) as nd from chunks group by ck)
select c.doc_id,
       count(*)::bigint as n_chunks,
       sum(case when f.nd >= 2 then 1 else 0 end)::bigint as n_dup_chunks,
       sum(case when f.nd >= 2 then c.clen else 0 end)::bigint as dup_bytes,
       sum(c.clen)::bigint as total_bytes
from chunks c join freq f using (ck)
group by c.doc_id
"""


ORACLES["cdc_dedup"] = _cdc_oracle_sql()

# clusters = the full chain (LSH pairs -> Jaccard>=0.5 verify -> connected
# components); components via a recursive CTE (min reachable node id ==
# min-label-propagation fixpoint). The verify threshold applies to the
# 6-dp-rounded jaccard on both sides.
ORACLES["dedup_minhash_clusters"] = _minhash_cte() + """
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
          union select b, a from verified)
select node as doc_id, rep_id from (
  with recursive r(node, reached) as (
    select src, src from edges
    union
    select r.node, e.dst from r join edges e on e.src = r.reached
  )
  select node, min(reached) as rep_id from r group by node
)
"""

# keep-best = the same cluster chain + token counts + per-cluster argmax
# (window rank on n_tokens desc, doc_id asc)
ORACLES["dedup_keep_best"] = _minhash_cte() + """
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
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached
    )
    select node, min(reached) as rep_id from r group by node
  )),
tc as (select doc_id,
              length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens
       from documents)
select rep_id, doc_id as keep_doc_id, n_members, n_tokens as best_n_tokens
from (
  select c.rep_id, c.node as doc_id, tc.n_tokens,
         row_number() over (partition by c.rep_id
                            order by tc.n_tokens desc, c.node asc) as rn,
         count(*) over (partition by c.rep_id) as n_members
  from comp c join tc on tc.doc_id = c.node)
where rn = 1
"""

ORACLES["tfidf_top_terms"] = """
with tf as (
  select doc_id, term, count(*)::bigint as tf
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '' group by doc_id, term),
df as (select term, count(*)::bigint as df from tf group by term),
n as (select count(*)::double as n_docs from documents),
scored as (
  select tf.doc_id, tf.term,
         round(tf.tf * ln((select n_docs from n) / df.df), 6) as tfidf
  from tf join df using (term)),
ranked as (
  select *, row_number() over (partition by doc_id
                               order by tfidf desc, term asc) as rn
  from scored)
select doc_id, term, tfidf from ranked where rn <= 3
"""

ORACLES["inverted_index"] = """
with posting as (
  select distinct term, doc_id
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> ''),
agg as (
  select term, count(*)::bigint as df,
         list(doc_id order by doc_id) as ids
  from posting group by term)
select term, df,
       array_to_string(list_slice(ids, 1, 10), ',') as postings
from agg
"""

def _simhash_cte_body() -> str:
    """CTE chain (no leading `with`) computing sim(doc_id, simhash) —
    the SQL replication of ``dd.simhash64`` over documents; shared by
    the signature, pair and cluster oracles."""
    return f"""
tk as (select doc_id,
              unnest({dd.SQL_TOKENIZE.format(col="text")}) as t
       from documents),
th as (select doc_id, ('0x' || substr(md5(t), 1, 16))::ubigint as h from tk),
bitix(bit) as (select unnest(range(64))),
bits as (
  select doc_id, bit,
         sum(case when (h >> bit) & 1 = 1 then 1 else -1 end) as acc
  from th cross join bitix group by doc_id, bit),
sim as (
  select doc_id,
         sum(case when acc > 0 then (1::hugeint << bit) else 0::hugeint end)
           ::ubigint as simhash
  from bits group by doc_id)
"""


ORACLES["dedup_simhash"] = "with " + _simhash_cte_body() + """
select doc_id, simhash,
       ((simhash >> 0) & 65535)::bigint as band0,
       ((simhash >> 16) & 65535)::bigint as band1,
       ((simhash >> 32) & 65535)::bigint as band2,
       ((simhash >> 48) & 65535)::bigint as band3
from sim
"""

# simhash pair CTE: band blocking + xor-popcount verify, replicating
# _simhash_band_pairs exactly (band math over the same sim() signatures)
_SIMHASH_PAIRS_TAIL = """,
sbandix(band_id) as (select unnest(range(4))),
sbands as (
  select doc_id, simhash, band_id,
         ((simhash >> (16 * band_id)) & 65535)::bigint as band_val
  from sim cross join sbandix),
spairs as (
  select distinct x.doc_id as a, y.doc_id as b,
         bit_count(xor(x.simhash, y.simhash))::bigint as hamming
  from sbands x join sbands y
    on x.band_id = y.band_id and x.band_val = y.band_val
   and x.doc_id < y.doc_id)
"""

ORACLES["dedup_simhash_pairs"] = (
    "with " + _simhash_cte_body() + _SIMHASH_PAIRS_TAIL
    + "select a, b, hamming from spairs where hamming <= 3"
)

ORACLES["dedup_simhash_clusters"] = (
    "with " + _simhash_cte_body() + _SIMHASH_PAIRS_TAIL + """,
sedges as (select a as src, b as dst from spairs where hamming <= 3
           union select b, a from spairs where hamming <= 3)
select node as doc_id, rep_id from (
  with recursive r(node, reached) as (
    select src, src from sedges
    union
    select r.node, e.dst from r join sedges e on e.src = r.reached
  )
  select node, min(reached) as rep_id from r group by node
)
"""
)

# cross-corpus incremental near-dedup: the minhash CTE's band table,
# cross-split candidate pairs, shingle-set Jaccard verify, per-new-doc
# rollup — replicating q_dedup_cross_corpus end to end
ORACLES["dedup_cross_corpus"] = _minhash_cte() + f""",
xp as (
  select distinct x.doc_id as a, y.doc_id as b
  from bands x join bands y
    on x.band_id = y.band_id and x.band_hash = y.band_hash
  where x.doc_id % {CROSS_MOD} = 0 and y.doc_id % {CROSS_MOD} <> 0),
xsd as (select doc_id, list_distinct(shingles) as sd from sh),
xverified as (
  select xp.a, xp.b
  from xp
  join xsd xa on xa.doc_id = xp.a
  join xsd xb on xb.doc_id = xp.b
  where round(len(list_intersect(xa.sd, xb.sd))::double /
              (len(xa.sd) + len(xb.sd) - len(list_intersect(xa.sd, xb.sd))),
              6) >= {CROSS_TAU})
select a as new_doc_id, min(b) as match_doc_id,
       count(*)::bigint as n_matches
from xverified group by a
"""

ORACLES["script_mix"] = """
with pg as (
  select doc_id,
         text || ' ' || repeat('Привет мир ', doc_id % 3)
              || repeat('中文网页 ', doc_id % 4)
              || repeat('42 ', doc_id % 2) as page
  from documents),
c as (
  select doc_id,
         len(regexp_extract_all(page, '[A-Za-z]'))::bigint as n_latin,
         len(regexp_extract_all(page, '[\\x{0400}-\\x{04FF}]'))::bigint
           as n_cyrillic,
         len(regexp_extract_all(page, '[\\x{4E00}-\\x{9FFF}]'))::bigint
           as n_cjk,
         len(regexp_extract_all(page, '[0-9]'))::bigint as n_digit
  from pg)
select doc_id, n_latin, n_cyrillic, n_cjk, n_digit,
       case when n_latin + n_cyrillic + n_cjk + n_digit = 0 then 'none'
            when n_latin >= n_cyrillic and n_latin >= n_cjk
                 and n_latin >= n_digit then 'latin'
            when n_cyrillic >= n_cjk and n_cyrillic >= n_digit
                 then 'cyrillic'
            when n_cjk >= n_digit then 'cjk'
            else 'digit' end as dominant_script,
       (n_cyrillic + n_cjk) * 1000000
         // greatest(n_latin + n_cyrillic + n_cjk + n_digit, 1)
         as nonlatin_ppm
from c
"""

ORACLES["dedup_prefix"] = f"""
with p as (
  select doc_id,
         md5(array_to_string(
           list_slice(list_filter(string_split(text, ' '),
                                  w -> w <> ''), 1, {PREFIX_K}),
           ' ')) as prefix_md5
  from documents)
select prefix_md5, count(*)::bigint as n_docs,
       min(doc_id) as keep_doc_id
from p group by prefix_md5 having count(*) >= 2
"""

ORACLES["readability"] = """
with c as (
  select doc_id,
         len(regexp_extract_all(text, '\\S+'))::bigint as words,
         len(regexp_extract_all(text, '[.!?]+'))::bigint as sents,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::bigint as syl
  from documents),
g as (select doc_id, words, sents, syl,
             greatest(words, 1)::hugeint as w,
             greatest(sents, 1)::hugeint as s
      from c)
select doc_id, words as n_words, sents as n_sentences,
       syl as n_syllables,
       ((206835*s*w - 1015*w*w - 84600*syl::hugeint*s) // (s*w))::bigint
         as flesch_milli
from g
"""

ORACLES["decontaminate"] = f"""
with bench as (
  select distinct substr(text, {DECON_OFF + 1}, {DECON_LEN}) as phrase
  from documents
  where doc_id % {DECON_MOD} = 0 and doc_id < {DECON_MAX_ID}
        and length(text) >= {DECON_OFF + 1 + DECON_LEN}
)
select d.doc_id,
       coalesce(sum(case when instr(d.text, b.phrase) > 0
                         then 1 else 0 end), 0)::bigint as n_hits,
       (case when coalesce(sum(case when instr(d.text, b.phrase) > 0
                                    then 1 else 0 end), 0) > 0
             then 1 else 0 end)::int as contaminated
from documents d left join bench b on true
group by d.doc_id
"""

ORACLES["quality_gopher"] = """
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, w, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per)
select doc_id, n_words::bigint as n_words, n_distinct::bigint as n_distinct,
       w as top_word,
       round(c / n_words, 6) as top_frac,
       round((n_words - n_distinct) / n_words, 6) as dup_frac
from ranked where rn = 1
"""

ORACLES["repetition_signals"] = """
with docs as (
  select doc_id,
         list_filter(string_split(text, ' '), w -> w <> '') as ws,
         list_filter(string_split(text, chr(10)), l -> l <> '') as ls
  from documents),
base as (select * from docs where len(ws) > 0),
lines as (
  select doc_id, count(*)::bigint as c, length(l)::bigint as nch
  from (select doc_id, unnest(ls) as l from base)
  group by doc_id, l),
lstats as (
  select doc_id,
         sum(c)::bigint as n_lines,
         round((sum(c) - count(*)) / sum(c), 6) as dup_line_frac,
         round(sum(nch * (c - 1)) / sum(nch * c), 6) as dup_line_char_frac
  from lines group by doc_id),
bgc as (
  select doc_id, g, count(*)::bigint as c
  from (select doc_id, ws[i] || ' ' || ws[i+1] as g
        from (select doc_id, ws, unnest(range(1, len(ws))) as i from base))
  group by doc_id, g),
bstats as (
  select doc_id,
         round(max(c) / sum(c), 6) as top_bigram_frac,
         round((sum(c) - count(*)) / sum(c), 6) as dup_bigram_frac
  from bgc group by doc_id),
tgc as (
  select doc_id, g, count(*)::bigint as c
  from (select doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] as g
        from (select doc_id, ws, unnest(range(1, len(ws) - 1)) as i
              from base))
  group by doc_id, g),
tstats as (
  select doc_id,
         round(max(c) / sum(c), 6) as top_trigram_frac,
         round((sum(c) - count(*)) / sum(c), 6) as dup_trigram_frac
  from tgc group by doc_id)
select b.doc_id,
       coalesce(l.n_lines, 0)::bigint as n_lines,
       coalesce(l.dup_line_frac, 0.0) as dup_line_frac,
       coalesce(l.dup_line_char_frac, 0.0) as dup_line_char_frac,
       coalesce(bs.top_bigram_frac, 0.0) as top_bigram_frac,
       coalesce(bs.dup_bigram_frac, 0.0) as dup_bigram_frac,
       coalesce(ts.top_trigram_frac, 0.0) as top_trigram_frac,
       coalesce(ts.dup_trigram_frac, 0.0) as dup_trigram_frac
from base b
left join lstats l using (doc_id)
left join bstats bs using (doc_id)
left join tstats ts using (doc_id)
"""

ORACLES["char_entropy"] = """
with chars as (
  select doc_id, substr(text, i + 1, 1) as ch
  from (select doc_id, text, unnest(range(0, length(text))) as i
        from documents where length(text) > 0)),
cc as (select doc_id, ch, count(*)::double as c
       from chars group by doc_id, ch),
tot as (select doc_id, sum(c) as n from cc group by doc_id)
select cc.doc_id,
       count(*)::bigint as n_distinct_chars,
       round(-sum((c / n) * log2(c / n)), 6) as char_entropy
from cc join tot using (doc_id)
group by cc.doc_id
"""

ORACLES["domain_quota"] = f"""
with r as (
  select doc_id, source,
         row_number() over (partition by source
                            order by md5(cast(doc_id as varchar)), doc_id)
           as rn
  from documents)
select doc_id, source from r where rn <= {DOMAIN_QUOTA}
"""

ORACLES["length_quantiles"] = """
with qs as (
  select unnest(cast([0.1, 0.25, 0.5, 0.75, 0.9, 0.99] as double[])) as q),
ranked as (
  select n_chars, row_number() over (order by n_chars) as rn
  from documents),
n as (select count(*)::bigint as c from documents)
select qs.q as q, min(ranked.n_chars)::bigint as value
from qs, ranked, n
where ranked.rn >= ceiling(qs.q * n.c)
group by qs.q
"""

ORACLES["global_rank"] = """
select doc_id, n_chars,
       row_number() over (order by n_chars, doc_id) as rnk
from documents
"""

ORACLES["mojibake"] = """
with page as (
  select doc_id, text || ' ' || repeat('Ã©â€™Â« ', doc_id % 3) as page
  from documents),
c as (
  select doc_id,
         ((length(page) - length(replace(page, 'Ã', '')))
        + (length(page) - length(replace(page, 'â€', ''))) / 2
        + (length(page) - length(replace(page, 'Â', ''))))::bigint
           as n_mojibake
  from page)
select doc_id, n_mojibake,
       (case when n_mojibake > 0 then 1 else 0 end)::bigint as damaged
from c
"""

ORACLES["tokenizer_fertility"] = """
with c as (
  select lang,
         length(regexp_extract_all(text, '\\S+'))::bigint as w,
         length(regexp_extract_all(
             text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::bigint as s
  from documents)
select lang, sum(w)::bigint as n_words, sum(s)::bigint as n_subtokens,
       (sum(s) * 1000000 // greatest(sum(w), 1))::bigint as fertility_ppm
from c group by lang
"""

# the verified-cluster chain (identical to dedup_minhash_clusters), then
# per-cluster member counts, then the size histogram
ORACLES["dup_cluster_sizes"] = _minhash_cte() + """
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
    with recursive r(node, reached) as (
      select src, src from edges
      union
      select r.node, e.dst from r join edges e on e.src = r.reached
    )
    select node, min(reached) as rep_id from r group by node
  )),
cs as (select rep_id, count(*)::bigint as n_members from comp group by rep_id)
select n_members as cluster_size, count(*)::bigint as n_clusters,
       sum(n_members)::bigint as n_docs
from cs group by n_members
"""

def _kmeans_sql_cte() -> str:
    """The unrolled two-round Lloyd chain shared by the kmeans and
    cluster_sample oracles: deterministic init (K lowest vec_ids),
    assignment = argmin of distance rounded to 4 dp with lowest-cluster
    tie-break, centroids re-rounded to 6 dp each update — byte-for-byte
    the engine's recipe."""
    return f"""
with e as (select vec_id, embedding::double[] as v from embeddings),
c0 as (select (row_number() over (order by vec_id)) - 1 as cluster, v
       from (select * from e order by vec_id limit {KMEANS_K})),
a1 as (select vec_id, v, cluster from (
  select e.vec_id, e.v, c0.cluster,
         row_number() over (partition by e.vec_id
           order by round(list_distance(e.v, c0.v), 4) asc,
                    c0.cluster asc) as rn
  from e cross join c0) where rn = 1),
c1 as (select cluster, list(value order by pos) as v from (
  select cluster, pos, round(avg(val), 6) as value from (
    select cluster, unnest(v) as val, generate_subscripts(v, 1) as pos
    from a1)
  group by cluster, pos) group by cluster),
a2 as (select vec_id, v, cluster from (
  select e.vec_id, e.v, c1.cluster,
         row_number() over (partition by e.vec_id
           order by round(list_distance(e.v, c1.v), 4) asc,
                    c1.cluster asc) as rn
  from e cross join c1) where rn = 1),
n2 as (select cluster, count(*)::bigint as n_members from a2
       group by cluster),
c2 as (select cluster, pos::bigint as pos, round(avg(val), 6) as value
       from (select cluster, unnest(v) as val,
                    generate_subscripts(v, 1) as pos from a2)
       group by cluster, pos)
"""


ORACLES["kmeans"] = _kmeans_sql_cte() + """
select c2.cluster::bigint as cluster, c2.pos, c2.value, n2.n_members
from c2 join n2 using (cluster)
"""

ORACLES["cluster_sample"] = _kmeans_sql_cte() + f"""
, c2v as (select cluster, list(value order by pos) as v from c2
          group by cluster),
a3 as (select vec_id, cluster from (
  select e.vec_id, c2v.cluster,
         row_number() over (partition by e.vec_id
           order by round(list_distance(e.v, c2v.v), 4) asc,
                    c2v.cluster asc) as rn
  from e cross join c2v) where rn = 1),
ranked as (select cluster::bigint as cluster, vec_id,
                  md5(cast(vec_id as varchar)) as rk,
                  row_number() over (partition by cluster
                    order by md5(cast(vec_id as varchar)) asc) as qn
           from a3)
select cluster, vec_id, rk from ranked where qn <= {CLUSTER_SAMPLE_Q}
"""

ORACLES["label_centroids"] = """
with flat as (
  select label, unnest(embedding) as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings)
select label, pos::bigint as pos, round(avg(val), 6) as value
from flat group by label, pos
"""

ORACLES["pii_redact"] = f"""
with page as (
  select doc_id,
         text || ' contact user' || doc_id || '@mail' || (doc_id % 7) ||
         '.com visit http://site' || (doc_id % 13) || '.example/p' ||
         doc_id || ' call 555-' || lpad((doc_id % 10000)::varchar, 4, '0')
           as page
  from documents)
select doc_id,
       regexp_replace(regexp_replace(regexp_replace(page,
           '{tx.PII_URL}', '<URL>', 'g'),
           '{tx.PII_EMAIL}', '<EMAIL>', 'g'),
           '{tx.PII_PHONE}', '<PHONE>', 'g') as clean,
       length(regexp_extract_all(page, '{tx.PII_URL}'))::bigint as n_urls,
       length(regexp_extract_all(page, '{tx.PII_EMAIL}'))::bigint as n_emails,
       length(regexp_extract_all(page, '{tx.PII_PHONE}'))::bigint as n_phones
from page
"""

ORACLES["url_dedup"] = f"""
with derived as (
  select doc_id,
    case doc_id % 5
      when 0 then 'https://' || source || '.example.com/' || lang || '/'
        || (doc_id % 200)::varchar
        || '?utm_source=feed&utm_campaign=x&id=' || (doc_id % 97)::varchar
      when 1 then 'https://' || source || '.example.com/' || lang || '/'
        || (doc_id % 200)::varchar || '#section-2'
      when 2 then upper('HTTPS://' || source || '.example.com') || '/'
        || lang || '/' || (doc_id % 200)::varchar
      when 3 then 'https://' || source || '.example.com:443/' || lang || '/'
        || (doc_id % 200)::varchar
      else 'https://' || source || '.example.com/' || lang || '/'
        || (doc_id % 200)::varchar || '?id=' || (doc_id % 97)::varchar
    end as url
  from documents),
cleaned as (
  select doc_id,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(url, '#.*', '', 'g'),
      '\\?{tx.URL_TRACKING}', '?', 'g'),
      '&{tx.URL_TRACKING}', '', 'g'),
      '\\?&', '?', 'g'),
      '[?&]$', '', 'g') as u
  from derived),
split as (
  select doc_id,
    lower(regexp_extract(u, '^([^:]+)://([^/?#]*)(.*)$', 1)) as scheme,
    lower(regexp_extract(u, '^([^:]+)://([^/?#]*)(.*)$', 2)) as host,
    regexp_extract(u, '^([^:]+)://([^/?#]*)(.*)$', 3) as rest
  from cleaned),
canon as (
  select doc_id,
    scheme || '://'
    || case when scheme = 'https' then regexp_replace(host, ':443$', '')
            when scheme = 'http' then regexp_replace(host, ':80$', '')
            else host end
    || rest as canon_url
  from split)
select canon_url, min(doc_id) as keep_doc_id, count(*)::bigint as n_variants
from canon group by canon_url
"""

ORACLES["lm_score"] = """
with tok as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
cnt as (select w, count(*)::bigint as c from tok group by w),
tot as (select count(*)::double as t from tok)
select doc_id, count(*)::bigint as n_tokens,
       round(sum(log2(t / c)) / count(*), 6) as lm_bits
from tok join cnt using (w) cross join tot
group by doc_id
"""

ORACLES["lm_bigram"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
tok as (
  select doc_id, unnest(ws) as w, unnest(range(1, len(ws) + 1)) as pos
  from base where len(ws) > 0),
tok2 as (
  select doc_id, pos, w,
         lag(w) over (partition by doc_id order by pos) as w1
  from tok),
uni as (select w, count(*)::bigint as c from tok group by w),
tot as (select count(*)::double as t from tok),
big as (select w1, w as w2, count(*)::bigint as cb
        from tok2 where w1 is not null group by w1, w),
ctx as (select w1, count(*)::bigint as cc
        from tok2 where w1 is not null group by w1),
bits as (
  select t2.doc_id,
         case when t2.w1 is null then log2(tot.t / u.c)
              else -log2({LM_LAMBDA!r} * (b.cb::double / x.cc)
                         + {1.0 - LM_LAMBDA!r} * (u.c / tot.t)) end as b
  from tok2 t2
  join uni u on u.w = t2.w
  left join big b on b.w1 = t2.w1 and b.w2 = t2.w
  left join ctx x on x.w1 = t2.w1
  cross join tot)
select doc_id, count(*)::bigint as n_tokens,
       round(sum(b) / count(*), 6) as lm2_bits
from bits group by doc_id
"""

def _heavy_hitters_sql() -> str:
    from ..stages.sketch import CMS_DEPTH, CMS_WIDTH

    def cell(w: str, j: str) -> str:
        return (
            f"(('0x' || substr(md5({w} || ':' || {j}::varchar), 1, 15))"
            f"::ubigint % {CMS_WIDTH})::bigint"
        )

    return f"""
with tok as (
  select unnest(list_filter(string_split(text, ' '), w -> w <> '')) as w
  from documents),
wc as (select w, count(*)::bigint as c from tok group by w),
cells as (
  select j, {cell("w", "j")} as pos, sum(c)::bigint as v
  from wc cross join generate_series(0, {CMS_DEPTH - 1}) t(j)
  group by j, pos),
tot as (select sum(v)::bigint as t from cells where j = 0),
est as (
  select w as word, min(v)::bigint as est
  from (
    select wc.w, cells.v
    from wc
    cross join generate_series(0, {CMS_DEPTH - 1}) g(j)
    join cells on cells.j = g.j
              and cells.pos = {cell("wc.w", "g.j")}
  ) group by w)
select word, est
from est cross join tot
where est >= (t + {HH_DENOM - 1}) // {HH_DENOM}
"""


ORACLES["heavy_hitters"] = _heavy_hitters_sql()

ORACLES["line_dedup"] = f"""
with base as (
  select doc_id, source, lang,
         list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
lines as (
  select doc_id, 0::bigint as line_no,
         'home about contact ' || source || ' navigation menu' as line
  from base
  union all
  select doc_id, (s // {tx.LINE_TOKENS})::bigint + 1 as line_no,
         array_to_string(list_slice(ws, s + 1, s + {tx.LINE_TOKENS}), ' ')
           as line
  from (select doc_id, ws, unnest(range(0, len(ws), {tx.LINE_TOKENS})) as s
        from base)
  union all
  select doc_id, 1000000::bigint as line_no,
         'copyright footer ' || lang || ' all rights reserved' as line
  from base),
freq as (select line, count(distinct doc_id) as nd from lines group by line)
select l.doc_id,
       count(*)::bigint as n_lines,
       sum(case when f.nd < {LINE_MIN_DOCS} then 1 else 0 end)::bigint
         as n_kept,
       coalesce(string_agg(case when f.nd < {LINE_MIN_DOCS} then l.line end,
                           chr(10) order by l.line_no), '') as text_clean
from lines l join freq f using (line)
group by l.doc_id
"""

ORACLES["tfidf_cosine_pairs"] = f"""
with tf as (
  select doc_id, term, count(*)::bigint as tf
  from (select doc_id, unnest(string_split(text, ' ')) as term
        from documents)
  where term <> '' group by doc_id, term),
df as (select term, count(*)::bigint as df from tf group by term),
n as (select count(*)::double as n_docs from documents),
w as (
  select tf.doc_id, tf.term, df.df,
         tf.tf * ln((select n_docs from n) / df.df) as w
  from tf join df using (term)
  where df.df <= {TFIDF_COS_DF_CAP}),
nrm as (select doc_id, sqrt(sum(w * w)) as nrm from w group by doc_id),
dot as (
  select x.doc_id as a, y.doc_id as b, sum(x.w * y.w) as dot
  from w x join w y on x.term = y.term and x.doc_id < y.doc_id
  where x.df >= 2
  group by x.doc_id, y.doc_id)
select d.a, d.b, round(d.dot / (na.nrm * nb.nrm), 4) as cos
from dot d
join nrm na on na.doc_id = d.a
join nrm nb on nb.doc_id = d.b
where round(d.dot / (na.nrm * nb.nrm), 4) >= {TFIDF_COS_TAU}
"""

ORACLES["media_phash_pairs"] = f"""
with h as (
  select doc_id,
         xor(('0x' || substr(md5('g' || (doc_id // 5)), 1, 15))
               ::ubigint::bigint,
             (case when doc_id % 5 <> 0
                   then (1::bigint << ((doc_id * 7) % {PHASH_BITS}))
                   else 0 end)
             | (case when doc_id % 5 >= 3
                     then (1::bigint << ((doc_id * 13) % {PHASH_BITS}))
                     else 0 end)) as phash
  from documents),
b as (
  select doc_id, phash, k, (phash >> (15 * k)) & 32767 as bv
  from h cross join (select unnest(range({PHASH_BANDS})) as k)),
cand as (
  select distinct x.doc_id as a, y.doc_id as b
  from b x join b y on x.k = y.k and x.bv = y.bv
                    and x.doc_id < y.doc_id)
select c.a, c.b,
       bit_count(xor(ha.phash, hb.phash))::bigint as hamming
from cand c
join h ha on ha.doc_id = c.a
join h hb on hb.doc_id = c.b
where bit_count(xor(ha.phash, hb.phash)) <= {PHASH_HAM_T}
"""

ORACLES["dedup_phash_clusters"] = f"""
with pr as ({ORACLES["media_phash_pairs"]}),
edges as (select a as src, b as dst from pr
          union select b, a from pr)
select node as doc_id, rep_id from (
  with recursive r(node, reached) as (
    select src, src from edges
    union
    select r.node, e.dst from r join edges e on e.src = r.reached
  )
  select node, min(reached) as rep_id from r group by node
)
"""

ORACLES["robots_filter"] = f"""
with u as (
  select doc_id, doc_id % 13 as k,
         'https://'
           || case when doc_id % 23 = 0 then 'adult-xxx-' else '' end
           || 'site' || (doc_id % 13) || '.example/'
           || case when doc_id % 19 = 0 then 'casino/' else '' end
           || 'page' || doc_id
           || case when doc_id % 29 = 0
                   then '?promo=cheap-pills-online' else '' end as url
  from documents),
p as (select doc_id, url, k,
             '/' || split_part(url, '.example/', 2) as path
      from u)
select doc_id, url,
       (starts_with(path, '/casino/')
        or (k % 3 = 0 and starts_with(path, '/page1'))) as blocked
from p
"""

ORACLES["decontaminate_semantic"] = f"""
with b as (select embedding from embeddings
           where vec_id % {DECON_SEM_MOD} = 0),
c as (select vec_id, embedding from embeddings
      where vec_id % {DECON_SEM_MOD} <> 0)
select c.vec_id,
       max(round(list_cosine_similarity(c.embedding::double[],
                                        b.embedding::double[]), 4))
         as max_sim,
       max(round(list_cosine_similarity(c.embedding::double[],
                                        b.embedding::double[]), 4))
         >= {DECON_SEM_TAU} as contaminated
from c cross join b
group by c.vec_id
"""


def _lang_count_sql(words: list[str]) -> str:
    return " + ".join(
        f"length(regexp_extract_all(page, '\\b{w}\\b'))" for w in words
    )


ORACLES["lang_id_multi"] = f"""
with p as (
  select doc_id,
         text || repeat(case doc_id % 4
                        when 0 then ' {" ".join(LANG_WORDS["en"])}'
                        when 1 then ' {" ".join(LANG_WORDS["de"])}'
                        when 2 then ' {" ".join(LANG_WORDS["fr"])}'
                        else ' {" ".join(LANG_WORDS["es"])}' end,
                        1 + doc_id % 3) as page
  from documents),
c as (
  select doc_id,
         length(regexp_extract_all(page, '\\S+'))::bigint as n_tokens,
         ({_lang_count_sql(LANG_WORDS["en"])})::bigint as s_en,
         ({_lang_count_sql(LANG_WORDS["de"])})::bigint as s_de,
         ({_lang_count_sql(LANG_WORDS["fr"])})::bigint as s_fr,
         ({_lang_count_sql(LANG_WORDS["es"])})::bigint as s_es
  from p)
select doc_id, n_tokens,
       case when greatest(s_en, s_de, s_fr, s_es) * 100
                 < {LANG_MIN_DENSITY_PCT} * greatest(n_tokens, 1)
              then 'und'
            when s_en >= s_de and s_en >= s_fr and s_en >= s_es then 'en'
            when s_de >= s_fr and s_de >= s_es then 'de'
            when s_fr >= s_es then 'fr'
            else 'es' end as pred_lang
from c
"""

ORACLES["domain_reputation"] = f"""
with f as (
  select doc_id, source,
         length(regexp_extract_all(text, '\\S+'))::bigint as tok,
         ({_stop_count_sql()})::bigint as stop
  from documents),
d as (
  select source,
         round(sum(stop) * 1.0 / greatest(sum(tok), 1), 6) as domain_score
  from f group by source)
select f.doc_id, f.source, d.domain_score,
       d.domain_score >= {DOMAIN_REP_MIN_STOP} as keep
from f join d using (source)
"""

ORACLES["url_filter"] = f"""
with u as (
  select doc_id,
         'https://'
           || case when doc_id % 23 = 0 then 'adult-xxx-' else '' end
           || 'site' || (doc_id % 13) || '.example/'
           || case when doc_id % 19 = 0 then 'casino/' else '' end
           || 'page' || doc_id
           || case when doc_id % 29 = 0
                   then '?promo=cheap-pills-online' else '' end as url
  from documents)
select doc_id, url,
       ({" + ".join(f"contains(url, '{w}')::bigint" for w in BAD_URL_WORDS)})
         as n_bad,
       ({" + ".join(f"contains(url, '{w}')::bigint" for w in BAD_URL_WORDS)})
         = 0 as keep
from u
"""

ORACLES["line_dedup_domain"] = f"""
with base as (
  select doc_id, source, lang,
         list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
lines as (
  select doc_id, source, 0::bigint as line_no,
         'home about contact ' || source || ' navigation menu' as line
  from base
  union all
  select doc_id, source, (s // {tx.LINE_TOKENS})::bigint + 1 as line_no,
         array_to_string(list_slice(ws, s + 1, s + {tx.LINE_TOKENS}), ' ')
           as line
  from (select doc_id, source, ws,
               unnest(range(0, len(ws), {tx.LINE_TOKENS})) as s
        from base)
  union all
  select doc_id, source, 1000000::bigint as line_no,
         'copyright footer ' || lang || ' all rights reserved' as line
  from base),
nd as (select source, count(*)::bigint as n_docs from base group by source),
freq as (select source, line, count(distinct doc_id) as df
         from lines group by source, line),
flagged as (
  select f.source, f.line,
         (f.df >= {DOMAIN_LINE_MIN}
          and f.df * 100 >= {DOMAIN_LINE_PCT} * n.n_docs) as dropit
  from freq f join nd n using (source))
select l.doc_id,
       count(*)::bigint as n_lines,
       sum(case when not d.dropit then 1 else 0 end)::bigint as n_kept,
       coalesce(string_agg(case when not d.dropit then l.line end,
                           chr(10) order by l.line_no), '') as text_clean
from lines l join flagged d on l.source = d.source and l.line = d.line
group by l.doc_id
"""

ORACLES["clean_c4"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
lines as (
  select doc_id, -1::bigint as line_no,
         'please enable javascript and cookies to continue.' as line
  from base where doc_id % 7 = 0
  union all
  select doc_id, (s // {tx.LINE_TOKENS})::bigint as line_no,
         array_to_string(list_slice(ws, s + 1, s + {tx.LINE_TOKENS}), ' ')
           || case (doc_id + (s // {tx.LINE_TOKENS})) % 4
                when 0 then '.' when 1 then '' when 2 then '!'
                else '?' end as line
  from (select doc_id, ws, unnest(range(0, len(ws), {tx.LINE_TOKENS})) as s
        from base)
  union all
  select doc_id, 1000000::bigint as line_no,
         'lorem ipsum dolor sit amet consectetur adipiscing elit.' as line
  from base where doc_id % 31 = 0
  union all
  select doc_id, 1000001::bigint as line_no,
         'function badge() {{ return 1; }}' as line
  from base where doc_id % 29 = 0),
page as (
  select doc_id, count(*)::bigint as n_lines,
         string_agg(line, chr(10) order by line_no) as page
  from lines group by doc_id),
k as (
  select doc_id, count(*)::bigint as n_kept,
         string_agg(line, chr(10) order by line_no) as text_clean
  from lines
  where regexp_matches(line, '[.!?"]$')
    and len(string_split(line, ' ')) >= {tx.C4_MIN_LINE_WORDS}
    and not contains(lower(line), 'javascript')
  group by doc_id)
select p.doc_id, p.n_lines, k.n_kept, k.text_clean
from page p join k using (doc_id)
where not contains(lower(p.page), 'lorem ipsum')
  and not contains(p.page, '{{')
  and k.n_kept >= {tx.C4_MIN_KEPT_LINES}
"""

ORACLES["chunk_windows"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
wins as (
  select doc_id, ws, unnest(range(0, len(ws), {tx.CHUNK_STRIDE})) as s
  from base where len(ws) > 0)
select doc_id, (s // {tx.CHUNK_STRIDE})::bigint as chunk_id,
       least({tx.CHUNK_TOKENS}, len(ws) - s)::bigint as n_tokens,
       array_to_string(list_slice(ws, s + 1, s + {tx.CHUNK_TOKENS}), ' ')
         as chunk
from wins
"""

ORACLES["pack_sequences"] = f"""
with tc as (
  select doc_id,
         length(regexp_extract_all(text, '[^ ]+'))::bigint as n_tokens
  from documents),
c as (
  select doc_id, n_tokens,
         coalesce(sum(n_tokens) over (order by doc_id
             rows between unbounded preceding and 1 preceding), 0)::bigint
           as start_tok
  from tc)
select doc_id, n_tokens, start_tok,
       (start_tok // {PACK_BUDGET})::bigint as seq_id
from c
"""

ORACLES["bigram_topk"] = f"""
with t as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
w as (select doc_id, unnest(ws) as w, generate_subscripts(ws, 1) as pos
      from t),
bg as (select a.w || ' ' || b.w as bigram
       from w a join w b on b.doc_id = a.doc_id and b.pos = a.pos + 1),
cnt as (select bigram, count(*)::bigint as n from bg group by bigram),
r as (select *, row_number() over (order by n desc, bigram asc) as rn
      from cnt)
select bigram, n from r where rn <= {BIGRAM_K}
"""

ORACLES["quality_tiers"] = f"""
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, w, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per),
s as (
  select doc_id, n_words,
         round(c / n_words, 6) as top_frac,
         round((n_words - n_distinct) / n_words, 6) as dup_frac
  from ranked where rn = 1)
select doc_id,
       case when n_words < {tx.TIER_LOW_WORDS} or dup_frac >= {tx.TIER_LOW_DUP}
                 or top_frac >= {tx.TIER_LOW_TOP} then 'low'
            when n_words >= {tx.TIER_HIGH_WORDS} and dup_frac < {tx.TIER_HIGH_DUP}
                 and top_frac < {tx.TIER_HIGH_TOP} then 'high'
            else 'mid' end as tier,
       n_words::bigint as n_words, top_frac, dup_frac
from s
"""

ORACLES["join_skewed"] = f"""
with fat as (
  select event_id,
         case when event_id % 4 <> 0 then 0
              else event_id % {SKEW_DIM} end as k,
         cast(floor(value * 1000000 + 0.5) as bigint) as micro
  from events),
dim as (
  select b::bigint as k, ((b * 7) % 13 + 1)::bigint as mult
  from unnest(range(0, {SKEW_DIM})) t(b))
select f.k, count(*)::bigint as n_events,
       sum(f.micro * d.mult)::bigint as weighted_micro
from fat f join dim d using (k)
group by f.k
"""

ORACLES["redirects"] = f"""
with ids as (select doc_id as id from documents),
nxt as (select id,
               case when id % {REDIR_BLOCK} = 0 then id else id - 1 end
                 as nxt
        from ids),
walk as (
  with recursive r(id, cur, hops) as (
    select id, id, 0 from ids
    union all
    select r.id, n.nxt, r.hops + 1
    from r join nxt n on n.id = r.cur
    where n.nxt <> r.cur
  )
  select id, cur, hops,
         row_number() over (partition by id order by hops desc) as rn
  from r)
select 'https://r.example/p' || id as url,
       'https://r.example/p' || cur as final_url,
       hops::bigint as hops
from walk where rn = 1
"""

ORACLES["filter_agreement"] = f"""
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, w, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per),
s as (
  select doc_id, n_words,
         round(c / n_words, 6) as top_frac,
         round((n_words - n_distinct) / n_words, 6) as dup_frac
  from ranked where rn = 1),
tiers as (
  select doc_id,
         case when n_words < {tx.TIER_LOW_WORDS}
                   or dup_frac >= {tx.TIER_LOW_DUP}
                   or top_frac >= {tx.TIER_LOW_TOP} then 'low'
              when n_words >= {tx.TIER_HIGH_WORDS}
                   and dup_frac < {tx.TIER_HIGH_DUP}
                   and top_frac < {tx.TIER_HIGH_TOP} then 'high'
              else 'mid' end as tier
  from s),
tri as (
  select doc_id, substr(text, i, 3) as g
  from documents, unnest(range(1, length(text) - 1)) as r(i)),
feats as (
  select doc_id,
         (('0x' || substr(md5(g), 1, 8))::uinteger
          % {HASH_FEATURE_BUCKETS})::bigint as bucket,
         count(*)::bigint as n
  from tri group by 1, 2),
w as (
  select b::bigint as bucket,
         ((('0x' || substr(md5(b::varchar), 1, 8))::uinteger
           % {LOGIT_WEIGHT_SPAN})::bigint - 500000) as w
  from unnest(range(0, {HASH_FEATURE_BUCKETS})) t(b)),
lg as (
  select f.doc_id, (sum(f.n * w.w) // greatest(sum(f.n), 1))::bigint
           as logit
  from feats f join w using (bucket) group by f.doc_id),
k as (
  select d.doc_id,
         (case when coalesce(lg.logit, 0) > 0 then 1 else 0 end)::bigint
           as keep
  from documents d left join lg using (doc_id))
select t.tier, k.keep, count(*)::bigint as n_docs,
       (count(*) * 1000000 //
        (select greatest(count(*), 1) from documents))::bigint as share_ppm
from tiers t join k using (doc_id)
group by t.tier, k.keep
"""

ORACLES["split_token_budget"] = f"""
with b as (
  select doc_id,
         (('0x' || substr(md5(cast(doc_id as varchar)), 1, 15))::ubigint
          % {SPLIT_BUCKETS})::bigint as bucket,
         length(regexp_extract_all(text, '\\S+'))::bigint as toks
  from documents),
s as (select case when bucket < {SPLIT_TRAIN} then 'train'
                  when bucket < {SPLIT_VALID} then 'valid'
                  else 'test' end as split, toks from b),
a as (select split, count(*)::bigint as n_docs,
             sum(toks)::bigint as n_tokens from s group by split),
tot as (select greatest(sum(n_tokens), 1) as tt from a)
select split, n_docs, n_tokens,
       (n_tokens * 1000000 // tot.tt)::bigint as token_share_ppm
from a, tot
"""

ORACLES["domain_stats"] = """
select source, lang, count(*)::bigint as n_docs,
       sum(n_chars)::bigint as total_chars,
       round(sum(n_chars)::double / count(*), 6) as avg_chars
from documents group by source, lang
"""

ORACLES["decontaminate_ngram"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
grams as (
  select doc_id,
         array_to_string(list_slice(ws, i, i + {tx.DECON_NGRAM} - 1), ' ')
           as g
  from (select doc_id, ws,
               unnest(range(1, len(ws) - {tx.DECON_NGRAM} + 2)) as i
        from base where len(ws) >= {tx.DECON_NGRAM})),
bench as (
  select distinct g from grams
  where doc_id % {DECON_MOD} = 0 and doc_id < {DECON_MAX_ID}),
hits as (
  select d.doc_id, count(distinct d.g)::bigint as n_gram_hits
  from grams d join bench b using (g) group by d.doc_id)
select doc.doc_id,
       coalesce(h.n_gram_hits, 0)::bigint as n_gram_hits,
       (case when coalesce(h.n_gram_hits, 0) > 0 then 1 else 0 end)::int
         as contaminated
from documents doc left join hits h using (doc_id)
"""

ORACLES["dedup_substring"] = f"""
with base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from documents),
wins as (
  select doc_id, i,
         array_to_string(list_slice(ws, i, i + {tx.SUBSTR_W} - 1), ' ') as w
  from (select doc_id, ws,
               unnest(range(1, len(ws) - {tx.SUBSTR_W} + 2,
                            {tx.SUBSTR_STRIDE})) as i
        from base where len(ws) >= {tx.SUBSTR_W})),
freq as (select w from wins group by w
         having count(distinct doc_id) >= 2),
cov as (
  select distinct doc_id, unnest(range(i, i + {tx.SUBSTR_W})) as pos
  from wins where w in (select w from freq)),
tok as (select doc_id, unnest(ws) as tokw, generate_subscripts(ws, 1) as p
        from base),
kept as (
  select t.doc_id, t.p, t.tokw
  from tok t left join cov c on c.doc_id = t.doc_id and c.pos = t.p
  where c.pos is null),
agg as (
  select doc_id, count(*)::bigint as n_kept,
         string_agg(tokw, ' ' order by p) as text_dedup
  from kept group by doc_id)
select b.doc_id, len(b.ws)::bigint as n_tokens,
       (len(b.ws) - coalesce(a.n_kept, 0))::bigint as n_removed,
       coalesce(a.text_dedup, '') as text_dedup
from base b left join agg a using (doc_id)
"""

ORACLES["build_training_set"] = f"""
with words as (
  select doc_id, w
  from (select doc_id, unnest(string_split(text, ' ')) as w from documents)
  where w <> ''),
per as (select doc_id, w, count(*)::bigint as c from words
        group by doc_id, w),
ranked as (
  select doc_id, c,
         sum(c) over (partition by doc_id) as n_words,
         count(*) over (partition by doc_id) as n_distinct,
         row_number() over (partition by doc_id
                            order by c desc, w asc) as rn
  from per),
s as (
  select doc_id, n_words,
         round(c / n_words, 6) as top_frac,
         round((n_words - n_distinct) / n_words, 6) as dup_frac
  from ranked where rn = 1),
tiered as (
  select doc_id from s
  where not (n_words < {tx.TIER_LOW_WORDS} or dup_frac >= {tx.TIER_LOW_DUP}
             or top_frac >= {tx.TIER_LOW_TOP})),
kept as (select d.doc_id, d.text from documents d join tiered using (doc_id)),
uniq as (
  select doc_id, text from (
    select doc_id, text,
           row_number() over (partition by md5(text) order by doc_id) as rn
    from kept)
  where rn = 1),
base as (
  select doc_id, list_filter(string_split(text, ' '), w -> w <> '') as ws
  from uniq),
chunks as (
  select doc_id, (s // {tx.CHUNK_STRIDE})::bigint as chunk_id,
         least({tx.CHUNK_TOKENS}, len(ws) - s)::bigint as n_tokens
  from (select doc_id, ws, unnest(range(0, len(ws), {tx.CHUNK_STRIDE})) as s
        from base where len(ws) > 0)),
packed as (
  select doc_id, chunk_id, n_tokens,
         coalesce(sum(n_tokens) over (order by doc_id, chunk_id
             rows between unbounded preceding and 1 preceding), 0)::bigint
           as start_tok
  from chunks)
select doc_id, chunk_id, n_tokens, start_tok,
       (start_tok // {PACK_BUDGET})::bigint as seq_id
from packed
"""

ORACLES["mix_rebalance"] = f"""
with c as (select lang, count(*)::bigint as n from documents group by lang),
m as (select min(n) as cmin from c),
r as (select lang, ({MIX_SCALE} * (select cmin from m)) // n as rate from c)
select d.doc_id, d.lang
from documents d join r using (lang)
where ('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))::uinteger
      % {MIX_SCALE} < r.rate
"""


def _link_pages_sql(pages_dir: str) -> str:
    return (
        "select url, html from read_parquet("
        f"'{pages_dir}/*.parquet')"
    )


def outlinks_oracle_sql(pages_dir: str) -> str:
    """regexp_extract_all over the decoded html replays the engine's
    compiled-regex finditer occurrence-for-occurrence (multigraph)."""
    return f"""
select url as src,
       unnest(regexp_extract_all(decode(html), 'href="([^"]*)"', 1)) as dst
from ({_link_pages_sql(pages_dir)})
"""


def indegree_oracle_sql(pages_dir: str) -> str:
    return f"""
select dst as url, count(*)::bigint as in_degree
from ({outlinks_oracle_sql(pages_dir)})
group by dst
"""


def anchor_text_oracle_sql(pages_dir: str) -> str:
    """Two-step regexp replay of q_anchor_text's single two-group
    finditer (DuckDB's regexp_extract_all yields one group, so the
    oracle extracts whole <a> tags first, then each group)."""
    return f"""
with tags as (
  select unnest(regexp_extract_all(
           decode(html), '<a href="[^"]*">[^<]*</a>')) as tag
  from ({_link_pages_sql(pages_dir)})),
pairs as (
  select regexp_extract(tag, 'href="([^"]*)"', 1) as dst,
         regexp_extract(tag, '>([^<]*)<', 1) as anchor
  from tags)
select dst as url,
       count(*)::bigint as n_anchors,
       count(distinct anchor)::bigint as n_distinct_anchors,
       min(anchor) as top_anchor
from pairs
group by dst
"""


def html_meta_oracle_sql(pages_dir: str) -> str:
    return f"""
select url,
       nullif(regexp_extract(decode(html), '<title>([^<]*)</title>', 1),
              '') as title,
       nullif(regexp_extract(decode(html), '<p>([^<]*)</p>', 1), '')
         as first_para,
       len(regexp_extract_all(decode(html), 'href="[^"]*"'))::bigint
         as n_links
from ({_link_pages_sql(pages_dir)})
"""


def snapshot_latest_oracle_sql(pages_dir: str) -> str:
    return f"""
select url, warc_ts, n_snapshots, text from (
  select url, warc_ts, text,
         count(*) over (partition by url)::bigint as n_snapshots,
         row_number() over (partition by url
                            order by warc_ts desc) as rn
  from read_parquet('{pages_dir}/*.parquet'))
where rn = 1
"""


def reciprocal_oracle_sql(pages_dir: str) -> str:
    return f"""
with links as ({outlinks_oracle_sql(pages_dir)}),
e as (select distinct src, dst from links where src <> dst)
select a.src as a, a.dst as b
from e a join e b on a.src = b.dst and a.dst = b.src
where a.src < a.dst
"""


def pagerank_oracle_sql(pages_dir: str, n: int = LINK_N) -> str:
    """Explicit 5-iteration unrolled replay of q_pagerank's integer
    fixed-point recurrence: same floor divisions (DuckDB ``//`` on
    bigints), same exact integer sums (order-independent), ghost-zero
    semantics via coalesce(s, 0) — bit-equality with both engine routes,
    ending in the identical single int->double division."""
    r0 = PR_SCALE // n
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
    iters = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
r{k} as (
  select p.url,
         {base} + ({PR_DAMP_NUM} * coalesce(s.s, 0)) // {PR_DAMP_DEN} as r
  from pages p left join (
    select e.dst as url, sum(rp.r // e.od)::bigint as s
    from edges e join {prev} rp on e.src = rp.url
    group by e.dst) s using (url))""")
        prev = f"r{k}"
    return f"""
with pages_raw as ({_link_pages_sql(pages_dir)}),
links as ({outlinks_oracle_sql(pages_dir)}),
outdeg as (select src, count(*)::bigint as od from links group by src),
edges as (select l.src, l.dst, o.od from links l join outdeg o using (src)),
pages as (select url from pages_raw),
r0 as (select url, {r0}::bigint as r from pages),{",".join(iters)}
select url, r / {PR_SCALE}.0 as pagerank from {prev}
"""


def _domain_similarity_oracle_sql() -> str:
    perms = ", ".join(
        f"({i}, {a}::hugeint, {b}::hugeint)"
        for i, (a, b) in enumerate(zip(dd.PERM_A, dd.PERM_B))
    )
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
with toks as (
  select source, {tokenize} as toks from documents),
sh as (
  select source,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
shu as (select source, unnest(shingles) as s from sh),
hv as (select source,
              ('0x' || substr(md5(s), 1, 16))::ubigint as h from shu),
perms(p_idx, a, b) as (values {perms}),
pv as (
  select source, p_idx,
         min(((a * h::hugeint + b) % 18446744073709551616::hugeint)::ubigint)
           as mh
  from hv cross join perms group by source, p_idx)
select a.source as src_a, b.source as src_b,
       sum(case when a.mh = b.mh then 1 else 0 end)::bigint as agree,
       round(sum(case when a.mh = b.mh then 1 else 0 end)
             / {dd.NUM_PERM}.0, 6) as est_jaccard
from pv a join pv b on a.p_idx = b.p_idx and a.source < b.source
group by 1, 2
"""


ORACLES["domain_similarity"] = _domain_similarity_oracle_sql()

ORACLES["dedup_editdist"] = _minhash_cte() + f"""
select p.a, p.b,
       levenshtein(substr(xa.text, 1, {EDITDIST_CAP}),
                   substr(xb.text, 1, {EDITDIST_CAP}))::bigint as editdist,
       (case when greatest(strlen(substr(xa.text, 1, {EDITDIST_CAP})),
                           strlen(substr(xb.text, 1, {EDITDIST_CAP}))) = 0
             then 1000000
             else (greatest(strlen(substr(xa.text, 1, {EDITDIST_CAP})),
                            strlen(substr(xb.text, 1, {EDITDIST_CAP})))
                   - levenshtein(substr(xa.text, 1, {EDITDIST_CAP}),
                                 substr(xb.text, 1, {EDITDIST_CAP})))
                  * 1000000
                  // greatest(strlen(substr(xa.text, 1, {EDITDIST_CAP})),
                              strlen(substr(xb.text, 1, {EDITDIST_CAP})))
        end)::bigint as sim_ppm
from pairs p
join documents xa on xa.doc_id = p.a
join documents xb on xb.doc_id = p.b
"""

ORACLES["dedup_funnel"] = f"""
with f as (
  select doc_id,
         length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens,
         case when ({_stop_count_sql()}) * 1.0 /
                   greatest(length(regexp_extract_all(text, '\\S+')), 1)
                   > 0.05
              then 'en' else 'und' end as predicted_lang,
         md5(text) as content_md5
  from documents)
select 'input' as stage, 0::bigint as stage_idx, count(*)::bigint as n
from f
union all
select 'quality', 1, count(*)::bigint from f where n_tokens >= 20
union all
select 'lang', 2, count(*)::bigint from f
where n_tokens >= 20 and predicted_lang = 'en'
union all
select 'exact_dedup', 3, count(distinct content_md5)::bigint from f
where n_tokens >= 20 and predicted_lang = 'en'
"""

ORACLES["monthly_growth"] = """
with m as (select (year(o_orderdate) * 100 + month(o_orderdate))::bigint
                    as ym,
                  round(sum(o_totalprice), 2) as revenue
           from orders group by 1),
w as (select ym, revenue, lag(revenue) over (order by ym) as prev from m)
select ym, revenue, round(revenue / prev - 1.0, 6) as growth
from w where prev is not null
"""

ORACLES["lang_confusion"] = (
    f"select lang, case when ({_stop_count_sql()}) * 1.0 / "
    "greatest(length(regexp_extract_all(text, '\\S+')), 1) > 0.05 "
    "then 'en' else 'und' end as predicted_lang, count(*)::bigint as n "
    "from documents group by 1, 2"
)

ORACLES["profile_table"] = " union all ".join(
    f"select '{c}' as \"column\", count(*)::bigint as n_rows, "
    f"(count(*) - count({c}))::bigint as n_null, "
    f"count(distinct {c})::bigint as n_distinct from orders"
    for c in PROFILE_COLUMNS
)

ORACLES["k_anonymity"] = f"""
select c_nationkey::bigint as c_nationkey, c_mktsegment,
       count(*)::bigint as n,
       (case when count(*) < {K_ANON} then 1 else 0 end)::bigint as at_risk
from customer group by 1, 2
"""

ORACLES["session_paths"] = f"""
with ordered as (
  select user_id, ts, event_id, event_type,
         case when ts - lag(ts) over w > interval {SESSION_GAP_S} seconds
                   or lag(ts) over w is null
              then 1 else 0 end as new_session
  from events
  window w as (partition by user_id order by ts, event_id)),
ses as (
  select user_id, ts, event_id, event_type,
         sum(new_session) over (partition by user_id
                                order by ts, event_id
                                rows unbounded preceding) as sid
  from ordered),
p as (select string_agg(event_type, '>' order by ts, event_id) as path
      from ses group by user_id, sid)
select path, count(*)::bigint as n from p group by path
order by n desc, path asc limit {SESSION_PATH_TOP_K}
"""

ORACLES["event_anomaly"] = """
with h as (select epoch_us(ts) // 3600000000 as hour,
                  count(*)::bigint as n
           from events group by 1),
m as (select median(n::double) as med from h),
d as (select median(abs(h.n::double - m.med)) as mad from h, m)
select h.hour, h.n,
       (case when abs(h.n::double - m.med) > 3 * d.mad
             then 1 else 0 end)::bigint as is_outlier
from h, m, d
"""

ORACLES["audience_overlap"] = """
with ut as (select distinct user_id, event_type from events),
tot as (select event_type, count(*)::bigint as nu from ut
        group by event_type),
pairs as (
  select a.event_type as type_a, b.event_type as type_b,
         count(*)::bigint as n_both
  from ut a join ut b
    on a.user_id = b.user_id and a.event_type < b.event_type
  group by 1, 2)
select p.type_a, p.type_b, p.n_both,
       round(p.n_both::double
             / (ta.nu + tb.nu - p.n_both)::double, 6) as jaccard
from pairs p
join tot ta on ta.event_type = p.type_a
join tot tb on tb.event_type = p.type_b
"""

ORACLES["corpus_kl"] = f"""
with t as (select source, unnest(string_split(text, ' ')) as term
           from documents),
tt as (select source, term from t where term <> ''),
c as (select term, count(*)::bigint as n from tt group by term),
top as (select term from (select term, n from c
                          order by n desc, term asc
                          limit {CORPUS_KL_TOP_K})),
st as (select source, term, count(*)::bigint as n
       from tt join top using (term) group by 1, 2),
srcs as (select distinct source from st),
grid as (select s.source, p.term from srcs s cross join top p),
fl as (select g.source, g.term, coalesce(st.n, 0) as n
       from grid g left join st
         on st.source = g.source and st.term = g.term),
tot as (select source, sum(n)::bigint as ns from fl group by source),
gl as (select term, sum(n)::bigint as gn from fl group by term),
gt as (select sum(n)::bigint as nn from fl),
kk as (select count(*)::bigint as k from top)
select f.source,
       round(sum(((f.n + 1)::double / (tot.ns + kk.k)::double)
                 * ln(((f.n + 1)::double / (tot.ns + kk.k)::double)
                      / ((gl.gn + 1)::double
                         / (gt.nn + kk.k)::double))), 6) as kl
from fl f
join tot using (source)
join gl using (term), gt, kk
group by f.source
"""

ORACLES["zipf_slope"] = f"""
with t as (select unnest(string_split(text, ' ')) as term from documents),
c as (select term, count(*)::bigint as n from t
      where term <> '' group by term),
top as (select n, row_number() over (order by n desc, term asc) as r
        from c order by n desc, term asc limit {ZIPF_TOP_K}),
m as (select count(*)::bigint as k,
             sum(ln(r::double)) as sx, sum(ln(n::double)) as sy,
             sum(ln(r::double) * ln(r::double)) as sxx,
             sum(ln(r::double) * ln(n::double)) as sxy
      from top)
select k as k_terms,
       case when k * sxx - sx * sx = 0 then 0.0
            else round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
       end as slope
from m
"""


def snapshot_editdist_oracle_sql(a_dir: str, b_dir: str) -> str:
    return f"""
select a.url,
       levenshtein(substr(a.text, 1, {EDITDIST_CAP}),
                   substr(b.text, 1, {EDITDIST_CAP}))::bigint as editdist
from read_parquet('{a_dir}/*.parquet') a
join read_parquet('{b_dir}/*.parquet') b using (url)
"""


ORACLES["join_storage_bucketed"] = (
    "select o_orderpriority, "
    "round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue, "
    "count(*) as n_lineitems from orders join lineitem "
    "on o_orderkey = l_orderkey group by o_orderpriority"
)

ORACLES["agg_incremental"] = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_revenue,
       round(sum(l_discount) / count(*), 6) as avg_disc,
       count(*) as n
from lineitem group by l_returnflag, l_linestatus
"""

ORACLES["domain_entropy"] = """
with c as (select source, count(*)::bigint as n from documents
           group by source),
t as (select sum(n)::bigint as nn from c)
select count(*)::bigint as n_sources,
       round(ln(nn::double)
             - sum(n::double * ln(n::double)) / nn::double, 6)
         as entropy_nats,
       round(max(n)::double / nn::double, 6) as top_share
from c, t group by nn
"""

ORACLES["event_transitions"] = """
with w as (
  select user_id, event_type,
         lag(event_type) over (
           partition by user_id order by ts, event_id) as prev_type
  from events)
select prev_type, event_type as next_type, count(*)::bigint as n
from w where prev_type is not null
group by 1, 2
"""

ORACLES["embed_standardize"] = """
with flat as (
  select vec_id, unnest(embedding)::double as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings),
s as (
  select pos, avg(val) as m,
         sqrt(greatest(avg(val * val) - avg(val) * avg(val), 0)) as sd
  from flat group by pos)
select f.vec_id, f.pos::bigint as pos,
       case when s.sd = 0 then 0.0
            else round((f.val - s.m) / s.sd, 6) end as z
from flat f join s using (pos)
"""

ORACLES["embed_covariance"] = """
with flat as (
  select vec_id, unnest(embedding)::double as val,
         generate_subscripts(embedding, 1) as pos
  from embeddings)
select a.pos::bigint as i, b.pos::bigint as j,
       round(sum(a.val * b.val) / count(*) - avg(a.val) * avg(b.val), 6)
         as cov
from flat a join flat b using (vec_id)
where a.pos <= b.pos
group by 1, 2
"""


def _shingle_cte_body(source: str = "documents") -> str:
    """(doc_id, distinct 3-token shingle list) CTE chain, same tokenizer
    and shingle construction as ``_minhash_cte_body`` without the
    minhash/band tail."""
    tokenize = dd.SQL_TOKENIZE.format(col="text")
    return f"""
toks as (
  select doc_id, {tokenize} as toks from {source}),
sh as (
  select doc_id,
         case when len(toks) >= 3 then
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         when len(toks) >= 1 then [array_to_string(toks, ' ')]
         else [] end as shingles
  from toks),
sd as (select doc_id, list_distinct(shingles) as s from sh)
"""


ORACLES["copy_search"] = f"""
with {_shingle_cte_body()},
q as (select doc_id as qid, s as qs from sd
      where doc_id = (select min(doc_id) from documents))
select d.doc_id, len(list_intersect(d.s, q.qs))::bigint as n_common,
       len(q.qs)::bigint as n_query
from sd d cross join q
where d.doc_id <> q.qid
order by n_common desc, d.doc_id asc
limit {COPY_SEARCH_K}
"""

ORACLES["signal_correlation"] = f"""
with sig as (
  select length(text)::bigint as c,
         length(regexp_extract_all(text, '\\S+'))::bigint as t,
         len(list_distinct({dd.SQL_TOKENIZE.format(col="text")}))::bigint as l
  from documents),
m as (
  select count(*)::hugeint as n,
         sum(c)::hugeint as sc, sum(t)::hugeint as st, sum(l)::hugeint as sl,
         sum(c*c)::hugeint as scc, sum(t*t)::hugeint as stt,
         sum(l*l)::hugeint as sll, sum(c*t)::hugeint as sct,
         sum(c*l)::hugeint as scl, sum(t*l)::hugeint as stl
  from sig)
select * from (
  select 'chars' as sig_a, 'tokens' as sig_b,
         case when n*scc - sc*sc = 0 or n*stt - st*st = 0 then 0.0
              else round((n*sct - sc*st)::double /
                         (sqrt((n*scc - sc*sc)::double) *
                          sqrt((n*stt - st*st)::double)), 6) end as corr
  from m
  union all
  select 'chars', 'types',
         case when n*scc - sc*sc = 0 or n*sll - sl*sl = 0 then 0.0
              else round((n*scl - sc*sl)::double /
                         (sqrt((n*scc - sc*sc)::double) *
                          sqrt((n*sll - sl*sl)::double)), 6) end
  from m
  union all
  select 'tokens', 'types',
         case when n*stt - st*st = 0 or n*sll - sl*sl = 0 then 0.0
              else round((n*stl - st*sl)::double /
                         (sqrt((n*stt - st*st)::double) *
                          sqrt((n*sll - sl*sl)::double)), 6) end
  from m)
"""


# Oracles whose SQL embeds literals derived from the GRAFT_ORACLE_SF_DIR
# fixture tables; all_oracles() can only compose them when that dir
# exists. The registry guard (tests/test_registry.py) subtracts this set
# when the fixture dir is absent so the consistency test is portable.
ENV_CONDITIONAL_ORACLES = frozenset(
    {
        "csv_roundtrip",
        "rowgroup_prune",
        "knn_ivf",
        "embed_pca",
        "knn_lsh",
        "ann_recall",
        "dedup_semantic",
        "embed_pq",
    }
)


def ledger_drift_oracle_sql() -> str:
    """Composed lazily: writes the ledger fixture on first call, then
    replays the drift join as DuckDB's real lag() window."""
    root = ledger_fixture()
    return f"""
with t as (
  select run_id, seq, sum(rows)::bigint as rows,
         sum(errors)::bigint as errors, sum(miss_rows)::bigint as miss
  from read_parquet('{root}/*.parquet') group by 1, 2),
l as (
  select run_id, seq, rows, errors, miss,
         lag(rows) over (order by seq) as prows,
         lag(errors) over (order by seq) as perr,
         lag(miss) over (order by seq) as pmiss
  from t)
select run_id, seq, rows,
       (rows - prows)::bigint as d_rows,
       (errors - perr)::bigint as d_errors,
       (miss - pmiss)::bigint as d_miss
from l where prows is not null
"""


def all_oracles() -> dict[str, str]:
    """ORACLES plus the lazily-composed entries (the flagship oracle
    writes its fixture corpus on first call, so it is not built at module
    import)."""
    out = dict(ORACLES)
    out["split_assign"] = SPLIT_ASSIGN_SQL
    out["embed_matryoshka"] = EMBED_MATRYOSHKA_SQL
    out["event_stationary"] = event_stationary_oracle_sql()
    out["event_entropy"] = event_entropy_oracle_sql()
    out["user_survival_curve"] = USER_SURVIVAL_SQL
    out["event_cusum"] = EVENT_CUSUM_SQL
    out["coverage_sample"] = coverage_oracle_sql()
    out["l_diversity"] = L_DIVERSITY_SQL
    out["event_gaps_hist"] = EVENT_GAPS_HIST_SQL
    out["domain_gini"] = DOMAIN_GINI_SQL
    out["ab_lift"] = AB_LIFT_SQL
    out["markov_perplexity"] = markov_perplexity_oracle_sql()
    out["ledger_drift"] = ledger_drift_oracle_sql()
    sf_for_csv = os.environ.get(
        "GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    if os.path.isfile(_pq(sf_for_csv, "documents")):
        out["csv_roundtrip"] = csv_roundtrip_oracle_sql(
            csv_corpus(sf_for_csv)
        )
        out["rowgroup_prune"] = rowgroup_prune_oracle_sql(
            rowgroup_corpus(sf_for_csv)
        )
    out["approx_distinct_hll"] = _hll_oracle_sql()
    out["skew_f2"] = skew_f2_oracle_sql()
    out["bm25_search"] = bm25_oracle_sql()
    out["embedding_outliers"] = EMBEDDING_OUTLIERS_SQL
    out["dsir_weights"] = DSIR_WEIGHTS_SQL
    out["top_terms_by_lang"] = TOP_TERMS_BY_LANG_SQL
    out["warc_roundtrip"] = warc_oracle_sql(warc_corpus()[1])
    out["cdx_index"] = cdx_oracle_sql(warc_corpus()[1])
    out["warc_fetch"] = warc_fetch_oracle_sql(warc_corpus()[1])
    out["bloom_dedup"] = BLOOM_DEDUP_SQL
    out["ccnet_buckets"] = ccnet_oracle_sql()
    out["bpe_pairs"] = BPE_PAIRS_SQL
    out["bpe_train"] = bpe_train_oracle_sql()
    out["bpe_encode"] = bpe_encode_oracle_sql()
    out["extract_synthetic"] = _flagship_oracle_sql()
    out["extract_grid_cards"] = _card_oracle_sql()
    link_dir = link_corpus()  # idempotent fixture write
    out["outlinks"] = outlinks_oracle_sql(link_dir)
    out["link_indegree"] = indegree_oracle_sql(link_dir)
    out["pagerank"] = pagerank_oracle_sql(link_dir)
    out["trustrank"] = trustrank_oracle_sql(link_dir)
    out["hits_rank"] = hits_oracle_sql(link_dir)
    out["link_components"] = link_components_oracle_sql(link_dir)
    out["graph_triangles"] = triangles_oracle_sql(link_dir)
    out["graph_assortativity"] = assortativity_oracle_sql(link_dir)
    out["label_prop"] = label_prop_oracle_sql(link_dir)
    out["weekday_seasonality"] = WEEKDAY_SEASONALITY_SQL
    out["attribution_delay"] = ATTRIBUTION_DELAY_SQL
    out["event_burstiness"] = EVENT_BURSTINESS_SQL
    out["crawl_budget"] = CRAWL_BUDGET_SQL
    out["length_lognormal"] = LENGTH_LOGNORMAL_SQL
    out["user_features"] = USER_FEATURES_SQL
    out["link_kcore"] = kcore_oracle_sql(link_dir)
    out["link_distance"] = linkdist_oracle_sql(link_dir)
    out["degree_distribution"] = degree_distribution_oracle_sql(link_dir)
    out["url_history"] = url_history_oracle_sql(recrawl_corpus())
    out["temporal_novelty"] = temporal_novelty_oracle_sql(recrawl_corpus())
    out["first_seen"] = first_seen_oracle_sql(recrawl_corpus())
    out["scd2_intervals"] = scd2_oracle_sql(recrawl_corpus())
    out["url_templates"] = url_templates_oracle_sql(urltrap_corpus())
    struct_dir = struct_corpus()  # idempotent fixture write
    out["pareto_concentration"] = PARETO_SQL
    out["log_odds_terms"] = log_odds_oracle_sql()
    out["ks_test"] = KS_TEST_SQL
    out["caps_ratio"] = CAPS_RATIO_SQL
    out["gap_exponential_fit"] = GAP_EXP_FIT_SQL
    out["cdc_chunk_stats"] = cdc_chunk_stats_oracle_sql()
    out["canonical_extract"] = canonical_extract_oracle_sql(
        struct_corpus())
    out["minhash_calibration"] = minhash_calibration_oracle_sql()
    out["token_quota"] = token_quota_oracle_sql()
    out["outline_depth_stats"] = outline_depth_oracle_sql(struct_corpus())
    out["simhash_idf"] = simhash_idf_oracle_sql()
    out["simhash_hamming_hist"] = (
        "with " + _simhash_cte_body() + _SIMHASH_PAIRS_TAIL
        + "select hamming::bigint as hamming, count(*)::bigint as n_pairs "
          "from spairs where hamming <= 3 group by hamming")
    out["fisher_dims"] = FISHER_SQL
    out["event_trigrams"] = EVENT_TRIGRAMS_SQL
    out["brand_return_rates"] = BRAND_RETURN_SQL
    out["part_supply_risk"] = PART_SUPPLY_RISK_SQL
    out["ship_delay_stats"] = SHIP_DELAY_SQL
    out["centroid_distances"] = centroid_distances_oracle_sql()
    sd_a, sd_b = schema_drift_fixture()
    out["schema_drift"] = schema_drift_oracle_sql(sd_a, sd_b)
    out["seasonal_backtest"] = SEASONAL_BACKTEST_SQL
    out["props_extract"] = PROPS_EXTRACT_SQL
    out["q5_local_supplier"] = Q5_SQL
    out["cluster_chaining_audit"] = (
        _minhash_cte() + CLUSTER_CHAINING_SQL_SUFFIX)
    out["score_reliability"] = score_reliability_oracle_sql()
    out["df_stopwords"] = DF_STOPWORDS_SQL
    out["dup_rate_estimate"] = dup_rate_oracle_sql()
    out["consistent_hash_assign"] = CONSISTENT_HASH_SQL
    out["span_intervals"] = span_intervals_oracle_sql()
    out["partitioned_write_roundtrip"] = PARTITIONED_WRITE_SQL
    out["match_spans"] = match_spans_oracle_sql()
    out["merge_upserts"] = MERGE_UPSERTS_SQL
    out["wau_rolling"] = WAU_ROLLING_SQL
    out["hll_cumulative"] = hll_cumulative_oracle_sql()
    out["domain_pagerank"] = domain_pagerank_oracle_sql(link_corpus())
    out["graph_negative_edges"] = graph_negative_edges_oracle_sql(
        link_corpus())
    out["score_calibrate"] = SCORE_CALIBRATE_SQL
    out["equidepth_bins"] = EQUIDEPTH_SQL
    out["join_bloom_prefilter"] = JOIN_BLOOM_SQL
    out["entity_clusters"] = entity_clusters_oracle_sql(er_corpus())
    out["html_to_markdown"] = html_to_markdown_oracle_sql(struct_dir)
    out["t_closeness"] = T_CLOSENESS_SQL
    out["shard_plan"] = SHARD_PLAN_SQL
    out["date_extract"] = date_extract_oracle_sql(struct_dir)
    out["jsonld_extract"] = jsonld_extract_oracle_sql(struct_dir)
    out["contrastive_pairs"] = CONTRASTIVE_SQL.format(NQ=N_QUERIES)
    out["heading_outline"] = heading_outline_oracle_sql(struct_dir)
    out["html_tables"] = html_tables_oracle_sql(struct_dir)
    out["rank_fusion"] = rank_fusion_oracle_sql()
    out["join_outer"] = JOIN_OUTER_SQL
    out["freq_itemsets"] = FREQ_ITEMSETS_SQL
    out["approx_quantiles"] = APPROX_QUANTILES_SQL
    er_dir = er_corpus()  # idempotent fixture write
    out["entity_resolve"] = entity_resolve_oracle_sql(er_dir)
    out["snm_pairs"] = snm_pairs_oracle_sql(er_dir)
    out["build_postings"] = BUILD_POSTINGS_SQL
    out["link_density"] = link_density_oracle_sql(link_corpus())
    out["snapshot_asof"] = snapshot_asof_oracle_sql(recrawl_corpus())
    out["crawl_schedule"] = crawl_schedule_oracle_sql(link_corpus())
    out["quality_composite"] = QUALITY_COMPOSITE_SQL.format(
        QSCORE=ORACLES["quality_score"]
    )
    pii_dir = pii_corpus()  # idempotent fixture write
    out["pii_scan"] = pii_scan_oracle_sql(pii_dir)
    out["pii_scrub"] = pii_scrub_oracle_sql(pii_dir)
    out["pii_gate"] = pii_gate_oracle_sql(pii_dir)
    out["bitext_mine"] = BITEXT_ORACLE_SQL
    out["leakage_free_split"] = leakage_free_split_oracle_sql()
    out["cocitation"] = cocitation_oracle_sql(link_dir)
    out["reciprocal_links"] = reciprocal_oracle_sql(link_dir)
    out["anchor_text"] = anchor_text_oracle_sql(link_dir)
    out["external_link_ratio"] = external_link_ratio_oracle_sql(link_dir)
    out["crawl_frontier"] = crawl_frontier_oracle_sql(link_dir)
    out["html_meta"] = html_meta_oracle_sql(link_dir)
    out["dom_templates"] = dom_templates_oracle_sql(link_dir)
    out["snapshot_latest"] = snapshot_latest_oracle_sql(recrawl_corpus())
    a_dir, b_dir = crawl_diff_corpus()
    out["snapshot_diff"] = snapshot_diff_oracle_sql(a_dir, b_dir)
    out["snapshot_editdist"] = snapshot_editdist_oracle_sql(a_dir, b_dir)
    out["snapshot_incremental"] = f"""
with d as ({snapshot_diff_oracle_sql(a_dir, b_dir)})
select d.url, d.status, b.text
from d join read_parquet('{b_dir}/*.parquet') b using (url)
where d.status in ('new', 'changed')
"""
    out["jsonl_roundtrip"] = f"""
select url, lang, score::bigint as score,
       length(regexp_extract_all(text, '\\S+'))::bigint as n_tokens
from read_json_auto('{jsonl_corpus()}', format='newline_delimited')
"""
    # knn_ivf's oracle embeds data-dependent centroid literals, so it is
    # composed against the driver's gate tables (sf0.01); the per-sf form
    # is pytest-verified at every sf in tests/test_knn_ivf_oracle.py
    ivf_sf = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    if os.path.isfile(_pq(ivf_sf, "embeddings")):
        out["knn_ivf"] = ivf_oracle_sql(ivf_sf)
        # embed_pca's eigenvector/mean literals are data-dependent in
        # the same way (recomputed independently from the raw parquet)
        out["embed_pca"] = pca_oracle_sql(ivf_sf)
        # knn_lsh's plane literals depend only on the embedding DIMENSION
        # (data-independent), read from the same gate tables
        out["knn_lsh"] = lsh_oracle_sql(ivf_sf)
        out["ann_recall"] = ann_recall_oracle_sql(ivf_sf)
        # dedup_semantic shares knn_ivf's data-dependent centroid literals
        out["dedup_semantic"] = semdedup_oracle_sql(ivf_sf)
        # embed_pq's subspace codebooks follow the same contract
        out["embed_pq"] = pq_oracle_sql(ivf_sf)
    return out
