"""Query registry facade.

The 289-entry registry lives in family modules (qdedup, qgraph, ...) split
from the former 23k-line monolith; this module re-exports every public and
private name so `from .queries import QUERIES` and test-side `q.<name>`
access keep working unchanged. Tests that monkeypatch size-routing
constants patch the defining family module (exposed below).
"""

from . import qhelpers as qhelpers  # noqa: F401
from . import qtext as qtext  # noqa: F401
from . import qdedup as qdedup  # noqa: F401
from . import qsimilarity as qsimilarity  # noqa: F401
from . import qrelational as qrelational  # noqa: F401
from . import qmedia as qmedia  # noqa: F401
from . import qflagship as qflagship  # noqa: F401
from . import qquality as qquality  # noqa: F401
from . import qgraph as qgraph  # noqa: F401
from . import qcuration as qcuration  # noqa: F401
from . import qtraining as qtraining  # noqa: F401
from . import qwarc as qwarc  # noqa: F401
from . import qanalytics as qanalytics  # noqa: F401
from . import qglobalstats as qglobalstats  # noqa: F401
from . import qpii as qpii  # noqa: F401
from . import qsnapshot as qsnapshot  # noqa: F401
from . import qextras as qextras  # noqa: F401
from . import qregistry as qregistry  # noqa: F401

from .qhelpers import (  # noqa: F401
    BROADCAST_MAX_ROWS, CRAWL_DELAY_S, DAY_US, EDITDIST_CAP,
    MARKERS, _apool, _lev_bytes, _pool,
    _pq, _read, _table_rows, adaptive_partitions_docs,
)
from .qtext import (  # noqa: F401
    q_doc_fingerprint, q_fingerprint, q_lang_id, q_normalize,
    q_pages_roundtrip, q_quality, q_rule_extract, q_token_count,
)
from .qdedup import (  # noqa: F401
    DECON_SEM_MOD, DECON_SEM_TAU, EMBED_DIMS, EMBED_QUANTIZE_SQL,
    JL_OUT_DIMS, KNN_K, N_QUERIES, SETSIM_BROADCAST_CAP,
    TFIDF_K, _distinct_pairs, _grouped_count, _jl_signs,
    _lsh_candidate_pairs, _lsh_distinct_pairs, q_cdc_dedup, q_decontaminate_semantic,
    q_dedup_containment, q_dedup_editdist, q_dedup_exact, q_dedup_jaccard,
    q_dedup_keep_best, q_dedup_minhash, q_dedup_minhash_clusters, q_dedup_minhash_est,
    q_dedup_simhash, q_embed_project, q_embed_quantize, q_embedding_neardup,
    q_inverted_index, q_ngram_novelty, q_setsim_join, q_syndication_pairs,
    q_tfidf_top_terms,
)
from .qsimilarity import (  # noqa: F401
    COVER_K, EMBED_MATRYOSHKA_SQL, KC_K, KNNG_K,
    KNNG_ORACLE_SQL, KNNG_QBLOCK, LSH_PLANES, LSH_TABLES,
    MRL_HALF, PQ_K, PQ_M, PQ_SUB,
    SEM_TAU, _centroid_literals, _embedding_dim, _gate_centroids,
    _gate_centroids_cached, _kc_matrix, _knng_final, _pq_codebooks,
    _pq_codebooks_cached, _query_vectors, _ts_minmax_footer, q_agg_lineitem,
    q_coverage_sample, q_dedup_semantic, q_embed_matryoshka, q_embed_pq,
    q_kcenter_sample, q_knn_brute, q_knn_graph, q_knn_ivf,
    q_knn_lsh,
)
from .qrelational import (  # noqa: F401
    HH_DENOM, HOUR_US, JOIN_BUCKETS, SESSION_GAP_S,
    _ASOF_CARRY_SCHEMA, _ASOF_MIXED_SCHEMA, _append_epoch_day, q_approx_distinct,
    q_asof_join, q_asof_join_bucketed, q_distinct_events, q_event_lag,
    q_event_lag_bucketed, q_heavy_hitters, q_join_bucketed, q_join_large,
    q_join_revenue, q_media_meta, q_multihop_join, q_sessionize,
    q_sessionize_bucketed, q_skew_f2, q_sliding_window, q_topk_orders,
    q_window_hourly,
)
from .qmedia import (  # noqa: F401
    FLAGSHIP_N, STRATIFIED_RATES, VOCAB_TOP_K, q_curate,
    q_curate_neardup, q_media_frames, q_sample_stratified, q_sample_systematic,
    q_top_terms,
)
from .qflagship import (  # noqa: F401
    card_corpus, flagship_corpus, q_extract_grid_cards, q_extract_synthetic,
)
from .qquality import (  # noqa: F401
    DECON_LEN, DECON_MAX_ID, DECON_MOD, DECON_OFF,
    DOMAIN_QUOTA, LINK_HREF_RE, LINK_N, PR_ITERS,
    _decon_phrases, q_decontaminate, q_domain_quota, q_repetition_signals,
    q_word_stats,
)
from .qgraph import (  # noqa: F401
    BAD_URL_WORDS, DOMAIN_REP_MIN_STOP, HTML_FIRST_P_RE, HTML_TITLE_RE,
    KCORE_DRIVER_EDGE_LIMIT, KCORE_K, KCORE_ROUNDS, LANG_MIN_DENSITY_PCT,
    LANG_WORDS, LINKDIST_DRIVER_EDGE_LIMIT, LINKDIST_MAX, LINK_ANCHOR_RE,
    PHASH_BANDS, PHASH_BITS, PHASH_BUCKET_CAP, PHASH_HAM_T,
    PR_DAMP_DEN, PR_DAMP_NUM, PR_DRIVER_EDGE_LIMIT, PR_SCALE,
    QUANTILE_QS, RANK_BUCKET, TFIDF_COS_DF_CAP, TFIDF_COS_TAU,
    TRUST_MOD, _TRUST_PAGE_RE, _dir_edges_ds, _filter_url,
    _grouped_sum_str, _kcore_distributed, _kcore_peel_batch, _linkdist_bfs_batch,
    _linkdist_distributed, _outlinks_ds, _pagerank_distributed, _pagerank_driver,
    _phash, _robots_rules, _trust_seed, _und_edges_ds,
    crawl_diff_corpus, jsonl_corpus, link_corpus, q_anchor_text,
    q_char_entropy, q_domain_reputation, q_external_link_ratio, q_global_rank,
    q_html_meta, q_jsonl_roundtrip, q_label_centroids, q_lang_id_multi,
    q_length_quantiles, q_link_distance, q_link_indegree, q_link_kcore,
    q_media_phash_pairs, q_outlinks, q_pagerank, q_reciprocal_links,
    q_robots_filter, q_snapshot_diff, q_snapshot_incremental, q_snapshot_latest,
    q_temporal_novelty, q_tfidf_cosine_pairs, q_trustrank, q_url_filter,
    recrawl_corpus,
)
from .qcuration import (  # noqa: F401
    BIGRAM_K, DOMAIN_LINE_MIN, DOMAIN_LINE_PCT, LINE_DROP_CAP,
    LINE_MIN_DOCS, LM_BIGRAM_CAP, LM_LAMBDA, LM_OOV_COUNT,
    LM_VOCAB_CAP, MIX_SCALE, PACK_BUDGET, SPLIT_BUCKETS,
    SPLIT_TRAIN, _bench_grams, _lm_bigram_join, _lm_score_join,
    _pii_page, q_bigram_topk, q_build_training_set, q_chunk_windows,
    q_clean_c4, q_decontaminate_ngram, q_dedup_substring, q_domain_stats,
    q_line_dedup, q_line_dedup_domain, q_lm_bigram, q_lm_score,
    q_mix_rebalance, q_pack_sequences, q_pii_redact, q_quality_tiers,
    q_url_dedup,
)
from .qtraining import (  # noqa: F401
    BM25_B, BM25_K1, BM25_TERMS, BM25_TOPK,
    DSIR_BUCKETS, DSIR_TARGET_LANG, DSIR_WEIGHTS_SQL, EMBEDDING_OUTLIERS_SQL,
    LANG_TOPK, OUTLIER_Z, SPLIT_ASSIGN_SQL, SPLIT_VALID,
    TOP_TERMS_BY_LANG_SQL, q_bm25_search, q_crawl_frontier, q_dsir_weights,
    q_embedding_outliers, q_split_assign, q_top_terms_by_lang, warc_corpus,
)
from .qwarc import (  # noqa: F401
    BLOOM_BITS, BLOOM_DEDUP_SQL, BLOOM_K, BPE_DRIVER_VOCAB_CAP,
    BPE_MERGES, BPE_PAIRS_SQL, BPE_TOPK, CCNET_HIST_DP,
    RESERVOIR_K, WARC_FETCH_MOD, _bloom_pos, _bpe_learn,
    _bpe_learn_cached, _bpe_learn_driver, q_bloom_dedup, q_bpe_encode,
    q_bpe_pairs, q_bpe_train, q_ccnet_buckets, q_cdx_index,
    q_warc_fetch, q_warc_roundtrip,
)
from .qanalytics import (  # noqa: F401
    CLUSTER_SAMPLE_Q, COCITE_MIN_COMMON, COLLOC_MIN_COUNT, COLLOC_VOCAB_BROADCAST_LIMIT,
    CROSS_MOD, CROSS_TAU, DECAY_HALFLIFE_US, DEDUP_EVAL_K,
    DOM_TAG_RE, HASH_FEATURE_BUCKETS, HITS_ITERS, HITS_SCALE,
    KMEANS_ITERS, KMEANS_K, LOGIT_WEIGHT_SPAN, LP_ITERS,
    MOJIBAKE_MARKERS, PHRASES, PREFIX_K, RANGE_WINDOW_S,
    REDIR_BLOCK, REDIR_ROUNDS, RFM_DAY_US, SAMPLE_WS_K,
    SAMPLE_W_K, SCRIPT_CJK, SCRIPT_CLASSES, SCRIPT_CYR,
    SKEW_DIM, SWEEP_TAUS_1E4, TOPIC_LEXICON, TOP_DOCS_PER_SOURCE,
    TRAP_DUP_FACTOR, TRAP_MIN_URLS, XLANG_K, XLANG_SRC,
    XLANG_TAU_1E4, XLANG_TGT, _WS_TOKEN_RE, _distinct_pairs_min,
    _distinct_rows, _eval_sample, _h60, _hist_order_stat,
    _hits_distributed, _hits_driver, _hits_rescale_q, _kmeans_assign,
    _kmeans_fit, _logit_weights, _lp_argmax, _lp_pre_count,
    _norm_int_blocks, _simhash_band_pairs, q_ann_recall, q_approx_distinct_hll,
    q_cluster_sample, q_cocitation, q_cohort_retention, q_collocations,
    q_dau, q_decayed_counts, q_dedup_cross_corpus, q_dedup_eval_exact,
    q_dedup_eval_lsh, q_dedup_prefix, q_dedup_simhash_clusters, q_dedup_simhash_pairs,
    q_dedup_threshold_sweep, q_degree_distribution, q_dom_templates, q_domain_dup_stats,
    q_dup_cluster_sizes, q_event_transitions, q_filter_agreement, q_funnel,
    q_global_quantiles, q_graph_triangles, q_hapax_rate, q_hash_features,
    q_hits_rank, q_join_skewed, q_key_skew, q_kmeans,
    q_label_prop, q_late_events, q_lexical_diversity, q_link_components,
    q_mirror_domains, q_mojibake, q_orders_without_lineitems, q_phrase_search,
    q_pivot_events, q_posting_gaps, q_quality_logit, q_quantiles_by_domain,
    q_range_join, q_range_join_bucketed, q_readability, q_redirects,
    q_rollup_source_lang, q_running_total, q_sample_reservoir, q_sample_weighted,
    q_sample_weighted_stratified, q_scd2_intervals, q_script_mix, q_session_stats,
    q_split_token_budget, q_tokenizer_fertility, q_top_docs_per_source, q_topic_tag,
    q_url_history, q_url_templates, q_user_rfm, q_vocab_coverage,
    q_winsorize, q_xlang_mine, urltrap_corpus,
)
from .qglobalstats import (  # noqa: F401
    AB_CONV_WINDOW_US, AB_LIFT_SQL, ATTRIBUTION_DELAY_SQL, CHURN_CUT_RATIO,
    COPY_SEARCH_K, CORPUS_KL_TOP_K, CRAWL_BUDGET_SQL, CRAWL_BUDGET_TOTAL,
    DOMAIN_GINI_SQL, EVENT_BURSTINESS_SQL, EVENT_CUSUM_SQL, EVENT_GAPS_HIST_SQL,
    EV_STAT_ITERS, EV_STAT_SCALE, JSB_BUCKETS, K_ANON,
    LDIV_BUCKET, LENGTH_LOGNORMAL_SQL, L_DIV, L_DIVERSITY_SQL,
    PROFILE_COLUMNS, PRUNE_NCHARS, PRUNE_RG_ROWS, SESSION_PATH_TOP_K,
    SURV_MAX_D, USER_FEATURES_SQL, USER_SURVIVAL_SQL, WEEKDAY_SEASONALITY_SQL,
    ZIPF_TOP_K, _bucketed_join_tables, _embed_moment_sums, _pca_top_component,
    csv_corpus, q_ab_lift, q_agg_incremental, q_attribution_delay,
    q_audience_overlap, q_copy_search, q_corpus_kl, q_crawl_budget,
    q_csv_roundtrip, q_dedup_funnel, q_dedup_phash_clusters, q_domain_entropy,
    q_domain_gini, q_domain_similarity, q_embed_covariance, q_embed_pca,
    q_embed_standardize, q_event_anomaly, q_event_burstiness, q_event_cusum,
    q_event_entropy, q_event_gaps_hist, q_event_stationary, q_first_seen,
    q_graph_assortativity, q_join_storage_bucketed, q_k_anonymity, q_l_diversity,
    q_lang_confusion, q_length_lognormal, q_markov_perplexity, q_monthly_growth,
    q_profile_table, q_rowgroup_prune, q_session_paths, q_signal_correlation,
    q_snapshot_editdist, q_user_features, q_user_survival, q_weekday_seasonality,
    q_zipf_slope, rowgroup_corpus,
)
from .qpii import (  # noqa: F401
    BITEXT_K, BITEXT_ORACLE_SQL, PII_EMAIL_RE, PII_IPV4_RE,
    PII_PHONE_RE, PII_SSN_RE, SNAPSHOT_ASOF_TS, _bitext_blocks,
    _merge_topk, _sim4, pii_corpus, q_bitext_mine,
    q_leakage_free_split, q_pii_gate, q_pii_scan, q_pii_scrub,
)
from .qsnapshot import (  # noqa: F401
    BUILD_POSTINGS_SQL, HTML_P_RE, LINKDENS_BOILER_PPM, POSTINGS_CAP,
    QUALITY_COMPOSITE_SQL, q_build_postings, q_crawl_schedule, q_join_outer,
    q_link_density, q_quality_composite, q_snapshot_asof,
)
from .qextras import (  # noqa: F401
    LEDGER_RUNS, ledger_fixture, q_ledger_drift,
    APPROXQ_RATE, APPROX_QUANTILES_SQL, BLOOMJOIN_BITS, BLOOMJOIN_K,
    BRAND_RETURN_SQL, CANONICAL_RE, CAPS_RATIO_SQL, CH_CRAWLERS,
    CH_VNODES, CLUSTER_CHAINING_SQL_SUFFIX, CONSISTENT_HASH_SQL, CONTRASTIVE_HI,
    CONTRASTIVE_K, CONTRASTIVE_LO, CONTRASTIVE_SQL, DATE_ISO_RE,
    DATE_TEXT_RE, DATE_US_RE, DF_STOPWORDS_SQL, DF_STOPWORD_PCT,
    DUPRATE_SAMPLE_K, EQUIDEPTH_B, EQUIDEPTH_SQL, ER_MAX_BLOCK,
    ER_MAX_DIST, EVENT_TRIGRAMS_SQL, FISHER_SQL, FISHER_TOP_K,
    FREQ_BUCKETS, FREQ_ITEMSETS_SQL, FREQ_MIN_SUPPORT, GAP_EXP_FIT_SQL,
    HEADING_RE, JOIN_BLOOM_SQL, JOIN_OUTER_SQL, JSONLD_RE,
    KS_SRC_A, KS_SRC_B, KS_TEST_SQL, LOGODDS_ALPHA,
    LOGODDS_TOP_K, MD_BLOCK_RE, MERGE_INS_N, MERGE_UPSERTS_SQL,
    NEG_CAND_T, NEG_PER_NODE, PARETO_SQL, PARETO_TOP_PCT,
    PARTITIONED_WRITE_SQL, PART_SUPPLY_RISK_SQL, PROPS_EXTRACT_SQL, PROPS_K_RE,
    Q5_REGION, Q5_SQL, RELIABILITY_BIN_WIDTH,
    RELIABILITY_OFFSET, RRF_K, SCORE_CALIBRATE_SQL, SEASONAL_BACKTEST_SQL,
    SEASONAL_LAG_DAYS, SHARD_PLAN_N, SHARD_PLAN_SQL, SHIP_DELAY_SQL,
    SIMHASH_IDF_VOCAB_CAP, SNM_WINDOW, SPAN_DIV, SPAN_GAP,
    TD_RE, TOKEN_QUOTA_B, TRIGRAM_TOP_K, TR_RE,
    T_CLOSENESS_SQL, WAU_ROLLING_SQL, WAU_WINDOW, _DOMAIN_RE,
    _MD_PREFIX, _MONTHS, _PAGE_ID_RE, er_corpus,
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
    schema_drift_fixture, struct_corpus,
)
from .qregistry import (  # noqa: F401
    QUERIES,
    ledger_drift_oracle_sql,
    ENV_CONDITIONAL_ORACLES, ORACLES, _SIMHASH_PAIRS_TAIL, _card_oracle_sql,
    _cdc_oracle_sql, _domain_similarity_oracle_sql, _flagship_oracle_sql, _heavy_hitters_sql,
    _hll_oracle_sql, _kmeans_sql_cte, _lang_count_sql, _link_pages_sql,
    _minhash_cte, _minhash_cte_body, _norm_expr, _rolling_oracle_sql,
    _setsim_oracle_sql, _shingle_cte_body, _simhash_cte_body, _stop_count_sql,
    all_oracles, anchor_text_oracle_sql, ann_recall_oracle_sql, assortativity_oracle_sql,
    bm25_oracle_sql, bpe_encode_oracle_sql, bpe_train_oracle_sql, canonical_extract_oracle_sql,
    ccnet_oracle_sql, cdc_chunk_stats_oracle_sql, cdx_oracle_sql, centroid_distances_oracle_sql,
    cocitation_oracle_sql, coverage_oracle_sql, crawl_frontier_oracle_sql, crawl_schedule_oracle_sql,
    csv_roundtrip_oracle_sql, date_extract_oracle_sql, dedup_eval_oracle_sql, dedup_threshold_sweep_oracle_sql,
    degree_distribution_oracle_sql, dom_templates_oracle_sql, domain_pagerank_oracle_sql, dup_rate_oracle_sql,
    embed_project_oracle_sql, entity_clusters_oracle_sql, entity_resolve_oracle_sql, event_entropy_oracle_sql,
    event_stationary_oracle_sql, external_link_ratio_oracle_sql, first_seen_oracle_sql, graph_negative_edges_oracle_sql,
    heading_outline_oracle_sql, hits_oracle_sql, hll_cumulative_oracle_sql, html_meta_oracle_sql,
    html_tables_oracle_sql, html_to_markdown_oracle_sql, indegree_oracle_sql, ivf_oracle_sql,
    jsonld_extract_oracle_sql, kcenter_oracle_sql, kcore_oracle_sql, label_prop_oracle_sql,
    leakage_free_split_oracle_sql, link_components_oracle_sql, link_density_oracle_sql, linkdist_oracle_sql,
    log_odds_oracle_sql, lsh_oracle_sql, markov_perplexity_oracle_sql, match_spans_oracle_sql,
    minhash_calibration_oracle_sql, mirror_domains_oracle_sql, outline_depth_oracle_sql, outlinks_oracle_sql,
    pagerank_oracle_sql, pca_oracle_sql, phrase_search_oracle_sql, pii_gate_oracle_sql,
    pii_scan_oracle_sql, pii_scrub_oracle_sql, pq_oracle_sql, rank_fusion_oracle_sql,
    reciprocal_oracle_sql, rowgroup_prune_oracle_sql, scd2_oracle_sql, schema_drift_oracle_sql,
    score_reliability_oracle_sql, semdedup_oracle_sql, simhash_idf_oracle_sql, skew_f2_oracle_sql,
    snapshot_asof_oracle_sql, snapshot_diff_oracle_sql, snapshot_editdist_oracle_sql, snapshot_latest_oracle_sql,
    snm_pairs_oracle_sql, span_intervals_oracle_sql, temporal_novelty_oracle_sql, token_quota_oracle_sql,
    topic_tag_oracle_sql, triangles_oracle_sql, trustrank_oracle_sql, url_history_oracle_sql,
    url_templates_oracle_sql, user_rfm_oracle_sql, warc_fetch_oracle_sql, warc_oracle_sql,
    xlang_mine_oracle_sql,
)
