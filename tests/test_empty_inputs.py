"""Empty-input robustness: a 100-TB pipeline hits empty partitions and
empty collections routinely (a new collection's first sync, a filter
that matches nothing, a backfill window with no data). Every operator
must return an EMPTY result — never raise — when its input tables have
rows=0 with the production schema. Found-by-probe regressions pinned
here: the vector family's driver-side loaders reshaped 0-row arrays
(numpy error) and kmeans built an untyped empty centroid literal."""

from __future__ import annotations

import os

import pytest

# operators touching each input family; a sample that covers every
# driver-side loader and every aggregation shape, not all 118 queries
# (the rest share these code paths)
SAMPLE = [
    "q1_pricing_summary",
    "sample_weighted_k",
    "text_pii_scrub",
    "embedding_standardize",
    "source_unigram_divergence",
    "lang_confusion_matrix",
    "events_decayed_activity",
    "dedup_rep_weights",
    "graph_triangle_count",
    "quality_classifier_trained",
    "quality_winsorize",
    "sketch_hll_distinct",
    "sketch_hll_incremental",
    "funnel_latency_quantiles",
    "mixture_temperature_weights",
    "events_rfm_segments",
    "events_sessionize",
    "text_token_count",
    "text_zipf_slope",
    "vocab_top_terms",
    "bpe_merge_candidates",
    "fingerprint_winnowing",
    "sketch_cms_heavy_hitters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_substring_spans",
    "dedup_substring_removal",
    "dedup_embedding_cosine",
    "semdedup_cells",
    "semdedup_incremental",
    "decontaminate_against_holdout",
    "decontam_bloom_semijoin",
    "decontam_incremental",
    "dsir_importance_weights",
    "select_token_budget",
    "cap_docs_per_source",
    "text_bigram_entropy",
    "corpus_yield_funnel",
    "pack_sequences",
    "chunk_documents",
    "rebalance_by_lang",
    "source_mixture_weights",
    "knn_brute_force",
    "ann_lsh_bucketed",
    "ann_ivf_probe",
    "ann_pq_adc",
    "pq_encode_codes",
    "ivf_cell_assignment",
    "kmeans_embeddings",
    "embedding_quantize_int8",
    "embedding_class_profile",
    "mm_media_manifest",
    "mm_audio_energy",
    "funnel_view_click_purchase",
    "semantic_decontam_cells",
    "stratified_split_report",
    "token_fertility_by_lang",
    "events_l_diversity",
    "source_quota_incremental",
    "range_join_clicks_before_purchase",
    "gopher_quality_rules",
    "quality_classifier_score",
    "embedding_covariance",
    "ngram_novelty_by_source",
    "novelty_incremental",
    "dedup_containment",
    "knn_label_agreement",
    "embedding_random_projection",
    "text_nfc_audit",
    "mm_cdc_chunk_dedup",
    "events_hourly_anomaly",
    "pca_power_projection",
    # round-6
    "dedup_lines_across_docs",
    "events_markov_transitions",
    "graph_degree_distribution",
    "text_readability",
    "embedding_norm_outliers",
    "minhash_signature_source_sim",
    "dedup_rate_by_source",
    "vocab_oov_rate_by_lang",
    "events_anomaly_mad",
    # round-7
    "basket_part_pairs",
    "customer_interpurchase",
    "events_type_cooccurrence_pmi",
    "events_dau_wau",
    "orders_pareto_share",
    "graph_component_sizes",
    "hll_event_type_overlap",
    "mixture_epoch_allocation",
    "text_token_entropy",
    "ann_recall_report",
    # round-7b
    "bm25_topk_retrieval",
    "chi2_discriminative_terms",
    "graph_kcore_parts",
    "kmeans_silhouette",
    "ols_discount_response",
    "user_survival_km",
    # round-7c
    "classifier_calibration_bins",
    "corpus_gini_balance",
    "user_path_entropy",
    "bm25_incremental_scoring",
    # round-8: every aggregate-over-empty must agree (the z-test's
    # all-NULL single row vs DuckDB's, the PSI NULL midpoint, empty
    # pair/cluster/drift tables)
    "orders_autocorrelation",
    "orders_seasonality_dow",
    "events_psi_drift",
    "events_ab_ztest",
    "supplier_leadtime_trend",
    "orders_benford_digit",
    "events_attribution_last_touch",
    "split_leakage_audit",
    "dedup_cluster_purity",
    "embedding_centroid_drift",
    # round-8b
    "part_affinity_topk",
    "graph_degree_assortativity",
    "dedup_minhash_precision",
    "simhash_hamming_profile",
    "supplier_scorecard",
    "events_psi_incremental",
    # round-8c
    "events_conversion_paths",
    "orders_cohort_repeat_rate",
    # round-8d
    "ivf_recall_report",
    "events_seasonal_anomaly",
    "events_ab_cuped",
    # round-8e
    "dedup_token_savings",
    "knn_kdist_outliers",
    "mm_phash_dedup",
    # round-9
    "events_cusum_changepoint",
    "quantiles_user_value_exact",
    "graph_local_clustering",
    "embedding_isotropy_report",
    "lexical_diversity_by_source",
    "orders_interarrival_burstiness",
    "funnel_time_bounded",
    "text_script_mix_audit",
    "user_bot_score",
    "funnel_by_arm",
    # round-10
    "tokenize_bpe_encode",
    "url_normalize_audit",
    "cap_docs_per_domain",
    "robots_disallow_filter",
    "events_srm_check",
    "orders_mann_whitney_u",
    "graph_lpa_communities",
    "events_welch_ttest",
    "graph_modularity_score",
    "dedup_url_canonical",
    "events_power_analysis",
    # round-11
    "tokenize_bpe_roundtrip",
    "split_by_neardup_cluster",
    "split_unigram_jsd",
    "events_jackknife_ci",
    "domain_effective_diversity",
    "hard_negative_mining",
    "matryoshka_recall_report",
    "blocking_quality_report",
    "approx_quantiles_histogram",
    "approx_quantiles_incremental",
    "events_diff_in_diff",
    "graph_eigenvector_centrality",
    "events_msprt_always_valid",
    "users_spearman_value_activity",
    "events_kruskal_wallis",
    "users_value_gini",
    # round-12
    "bm25_ndcg_report",
    "embedding_whitening_report",
    "graph_hyperball_reach",
    "tokenize_unigram_eval",
    "graph_harmonic_centrality",
    "events_fdr_bh",
    "hybrid_rrf_retrieval",
    # round-12b
    "events_ratio_metric_delta",
    "graph_adamic_adar",
    "ql_dirichlet_topk",
    "er_fellegi_sunter",
    "orders_ewma_control",
    "orders_theil_sen_trend",
    "text_heaps_law_fit",
    "events_bootstrap_ci",
    # round-12c
    "rm3_expansion_terms",
    "orders_stl_decompose",
    "text_mattr_diversity",
    "classifier_lift_gains",
    "ewma_control_incremental",
    "mm_scene_cuts",
]

TABLES = (
    "documents",
    "embeddings",
    "events",
    "orders",
    "lineitem",
    "customer",
    "supplier",
    "part",
    "nation",
    "region",
)


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", SAMPLE)
def test_operator_handles_empty_input(spark, empty_dir, name):
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    rows = fn(spark, empty_dir).collect()
    if name in (
        "text_zipf_slope",
        "corpus_yield_funnel",
        "funnel_view_click_purchase",
        "graph_triangle_count",
        "funnel_latency_quantiles",
        # fixed 3-segment report: NULL-valued rows on both engines
        # (the oracle's UNION ALL of three empty-table aggregates)
        "orders_pareto_share",
        # one-row corpus-balance summary: (n_sources=0, NULL, NULL)
        # on both engines
        "corpus_gini_balance",
        # one-row experiment summary: zero counts, NULL rates/z on
        # both engines (the oracle's SELECT over an empty-agg row)
        "events_ab_ztest",
        # one-row index-quality / graph-structure summaries: zero
        # counts, NULL ratios on both engines
        "dedup_minhash_precision",
        "graph_degree_assortativity",
        # one-row experiment summary, zero counts + NULL z
        "events_ab_cuped",
        # one-row geometry report: all-NULL aggregate row on both
        # engines (no non-NULL covariance cells exist)
        "embedding_isotropy_report",
        # fixed 3-stage report (zero-valued), the
        # funnel_view_click_purchase contract
        "funnel_time_bounded",
        # one-row experiment summaries: zero counts + NULL stats on
        # both engines (agg without groupBy always emits its row)
        "events_srm_check",
        "orders_mann_whitney_u",
        "events_welch_ttest",
        "graph_modularity_score",
        "events_power_analysis",
        # one-row blocking-eval summary: zero counts + NULL ratios on
        # both engines (the 1-row stat frames crossjoin to one row)
        "blocking_quality_report",
        # one-row 2x2 experiment summary: zero counts + NULL means on
        # both engines (agg without groupBy always emits its row)
        "events_diff_in_diff",
        # one-row always-valid readout: zero counts + NULL stats
        "events_msprt_always_valid",
        # one-row correlation summary: (n=0, NULL, NULL, NULL)
        "users_spearman_value_activity",
        # one-row k-arm / concentration summaries: zero counts + NULLs
        "events_kruskal_wallis",
        "users_value_gini",
        # one-row ratio/trend/bootstrap summaries: zero counts + NULL
        # stats on both engines (agg without groupBy emits its row;
        # the 1-row stat frames crossjoin to one row)
        "events_ratio_metric_delta",
        "orders_theil_sen_trend",
        "events_bootstrap_ci",
        # 4-row field table from the one-row moment aggregate (the
        # oracle's UNION ALL of four selects over the empty-agg row)
        "er_fellegi_sunter",
    ):
        # whole-corpus summaries and fixed-stage reports legitimately
        # emit their summary/stage rows (NULL/zero-valued) for an
        # empty corpus
        assert len(rows) >= 1
    else:
        assert rows == []
