"""Driver-style oracle checks in miniature: run a representative subset of
queries() against their oracle_sql() with DuckDB at sf0.001 (the full set
runs in the driver at sf0.01; this keeps CI fast while pinning the compare
machinery and column-name contract)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

SUBSET = [
    "filter_project_lang",
    "scalar_string_fns",
    "grouped_agg_user_value",
    "tpch_q1_like",
    "topk_orders",
    "dedup_first_event_per_user",
    "join_orders_customer",
    "tpch_q3_like",
    "explode_top_tokens",
    "dedup_exact_text",
    "quality_score",
    "token_jaccard_pairs",
    "ann_cosine_topk",
    "embedding_norm_by_label",
    "sessionize_events",
    "multimodal_decode_meta",
    "window_running_sum",
    "case_bucket_orders",
    "customers_without_orders",
    "revenue_by_region",
    "embedding_neardup",
    "salted_count_event_type",
    "hash_sample_events",
    "value_quantiles",
    "top_orders_per_segment",
    "event_type_pivot",
    "training_mix",
    "neardup_cluster_keep",
    "gopher_repetition",
    "benchmark_decontaminate",
    "stratified_sample_by_lang",
    "normalize_text",
    "token_postings_stats",
    "volume_shipping",
    "sliding_window_counts",
    "group_sample_docs",
    "native_join_revenue_by_status",
    "token_budget_sample",
    "paragraph_dedup",
    "pii_redact",
    "revenue_rollup",
    "tfidf_top_terms",
    "grouped_quantiles",
    "edit_distance_nn",
    "weighted_sample_docs",
    "pagerank_docs",
    "substring_span_dedup",
    "train_shard_export",
    "kmeans_embeddings",
    "corpus_snapshot_diff",
    "source_ngram_overlap",
    "winsorize_doclen",
    "ntile_orders",
    "cc_label_propagation",
    "windowed_dedup_events",
    "ppjoin_neardup",
    "incremental_user_state",
    "triangle_count_docs",
    "skyline_orders",
    "mode_event_type",
    "event_type_overlap",
    "funnel_signup_view_purchase",
    "corr_price_day_by_status",
    "entropy_event_mix",
    "distinct_users_per_type",
    "bigram_cross_entropy",
    "native_anti_join_customers",
    "retention_cohorts",
    "dsir_importance",
    "event_transitions",
    "ols_trend_by_type",
    "ewma_user_value",
    "chisq_event_mix",
    "gini_order_value",
    "max_concurrent_sessions",
    "semdedup_embeddings",
    "pack_sequences",
    "revenue_cube",
    "mad_order_value",
    "latest_events_per_user",
    "bm25_topk",
    "khop_bfs_distance",
    "collapse_repeated_chunks",
    "window_frames_user_value",
    "hits_docs",
    "custdist",
    "exists_discounted_orders",
    "large_volume_orders",
    "rich_inactive_customers",
    "unpivot_orders",
    "zscore_doclen_by_lang",
    "behavior_signatures",
    "histogram_order_value",
    "spearman_price_date_by_status",
    "daily_new_users",
    "profile_orders",
    "orders_above_customer_avg",
    "user_set_ops",
    "rs_simjoin",
    "sssp_weighted",
    "scd2_user_status",
    "resample_ffill_daily",
    "percentile_cont_price",
    "order_status_seq",
    "activity_streaks",
    "dense_rank_top_prices",
    "inter_event_gap_stats",
    "grouped_percentile_cont",
    "tpch_q15_like",
    "tpch_q5_like",
    "cov_matrix_lineitem",
    "tpch_q14_like",
    "tpch_q19_like",
    "tpch_q17_like",
    "tpch_q10_like",
    "tpch_q8_like",
    "tpch_q6_like",
    "tpch_q11_like",
    "tpch_q12_like",
    "tpch_q16_like",
    "tpch_q20_like",
    "tpch_q21_like",
    "tpch_q2_like",
    "tpch_q9_like",
    "bootstrap_mean_value",
    "percent_rank_orders",
    "pmi_top_collocations",
    "train_valid_test_split",
    "ohlc_hourly",
    "rolling_median_value",
    "assoc_rules_events",
    "trending_daily_topk",
    "js_divergence_sources",
    "type_cardinality_distribution",
    "cusum_daily_drift",
    "hampel_outliers",
    "autocorr_daily_lag1",
    "mutual_info_source_lang",
    "linear_interp_fill_daily",
    "apriori_frequent_itemsets",
    "survival_km_purchase_gaps",
    "rfm_segments",
    "holt_linear_daily",
    "benford_price_digits",
    "mannwhitney_click_vs_view",
    "kcore_docs",
    "rrf_fusion_docs",
    "psi_value_drift",
    "readability_by_lang",
    "ks_test_click_view",
    "naive_bayes_lang",
    "dq_expectations",
    "clustering_coeff_docs",
    "adamic_adar_linkpred",
    "seasonal_dow_anomaly",
    "welch_ttest_click_purchase",
    "theil_sen_daily",
    "phrase_search_top_bigram",
    "item_cooccurrence_cf",
    "weighted_median_price_by_status",
    "stl_weekly_decomposition",
    "decision_stump_price",
    "ols_two_feature",
    "quantile_normalize_chars",
    "cuped_adjusted_ab",
    "ndcg_by_source",
    "binseg_changepoint_daily",
    "twap_user_value",
    "wilson_topk_days",
    "attribution_credit",
    "haar_energy_daily",
    "hurst_rs_daily",
    "xcorr_click_purchase",
    "mase_seasonal_naive",
    "did_estimator",
    "ece_calibration",
    "anova_value_by_type",
    "ar2_yule_walker_daily",
    "zipf_slope_words",
    "pca_power_iteration",
    "kendall_tau_qty_discount",
    "mrr_first_relevant",
    "logreg_purchase_gd",
    "seq_pattern_pairs",
    "kappa_event_vs_user_mode",
    "kruskal_wallis_value_by_type",
    "modularity_by_lang",
    "huber_location_value",
    "roc_auc_purchase_value",
    "heaps_law_sources",
    "brier_decomposition",
    "degree_assortativity_docs",
    "simpsons_paradox_audit",
    "source_tf_cosine",
    "max_drawdown_daily",
    "markov_stationary",
    "gumbel_weekly_maxima",
    "jarque_bera_value",
    "word_dispersion_dp",
    "hhi_revenue_concentration",
    "fano_overdispersion_by_type",
    "lorenz_decile_shares",
    "sprt_conversion_days",
    "durbin_watson_daily_revenue",
    "mann_kendall_daily_revenue",
    "grubbs_order_value",
    "runs_test_daily_revenue",
    "ljung_box_daily_revenue",
    "yule_k_by_source",
    "brown_forsythe_value_by_type",
    "mcnemar_click_purchase_daily",
    "cochran_armitage_segment_orders",
    "logrank_purchase_gaps",
    "cronbach_alpha_event_types",
    "burrows_delta_sources",
    "friedman_event_value_ranks",
    "dixon_q_order_value",
    "markov_entropy_rate",
    "page_trend_event_types",
    "wilcoxon_signed_rank_click_view",
    "partial_corr_lineitem",
    "mood_median_value_by_type",
    "cohens_d_click_purchase",
    "markov_dependence_chi2",
    "icc_value_by_user",
    "neweywest_daily_revenue",
    "odds_ratio_click_purchase_daily",
    "cramer_von_mises_click_view",
    "cox_stuart_daily_revenue",
    "theil_u2_daily_revenue",
    "weekly_periodogram_power",
    "bowley_moors_order_value",
    "graph_reciprocity_docs",
    "theil_atkinson_order_value",
    "duncan_segregation_dow",
    "confusion_metrics_purchase",
    "permutation_entropy_daily",
    "chao1_bigram_richness",
    "dickey_fuller_daily",
    "distance_corr_qty_discount",
    "engle_granger_rev_orders",
    "pacf_daily_revenue",
    "hbos_order_outliers",
    "pettitt_changepoint_daily",
    "yuen_trimmed_ttest",
    "dominant_period_scan",
    "holt_winters_weekly",
    "rbo_chars_vs_hash",
    "anderson_darling_click_view",
    "burstiness_memory_gaps",
    "seasonal_mann_kendall_dow",
    # early-round queries previously covered only by driver sampling —
    # pinned here too so the full oracled set is pytest-checked
    "asof_purchase_last_view",
    "between_dates",
    "distinct_langs",
    "doc_fingerprint",
    "groupby_count_source",
    "heavy_users_having",
    "join_lineitem_part_brand",
    "json_extract_props",
    "range_join_clicks_before_error",
    "token_count_by_lang",
    "ts_bucket_hourly",
    "union_filtered",
]


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as E
    from scrapy_ray.pipelines.oracle import compare, duckdb_run

    fn = E.queries()[name]
    sql = E.oracle_sql()[name]
    ok, msg = compare(fn(SF), duckdb_run(SF, sql))
    assert ok, msg


def test_all_oracle_keys_subset_of_queries():
    import __ray_entry__ as E

    qs = set(E.queries())
    sqls = set(E.oracle_sql())
    assert sqls <= qs
    assert len(qs) >= 30


def test_entry_smoke(ray_session):
    import __ray_entry__ as E

    ds = E.entry()
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert {"url", "name", "rating", "extracted_text"} <= names


def test_skyline_sweep_matches_brute_force():
    """The O(n log n) 2D skyline sweep must equal the NOT-EXISTS domination
    definition on random inputs, including duplicate (date, cents) points
    (which never dominate each other)."""
    import numpy as np

    from scrapy_ray.pipelines.queries7 import _skyline_2d

    rng = np.random.RandomState(7)
    for _ in range(200):
        n = rng.randint(1, 40)
        c = rng.randint(0, 8, n).astype(np.int64)
        d = rng.randint(0, 8, n).astype(np.int64)
        got = _skyline_2d(c, d)
        brute = np.array([
            not any((c[j] >= c[i]) and (d[j] <= d[i])
                    and (c[j] > c[i] or d[j] < d[i]) for j in range(n))
            for i in range(n)])
        assert (got == brute).all()
