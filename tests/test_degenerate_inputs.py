"""Degenerate-shape differential gates: single-row tables and
constant-key columns.  The single-row probe found four real defects —
`ivf_cell_assignment` crashed when the centroid slice was empty
(missing the guard its siblings had), `pagerank_neardup_graph` divided
by zero on an empty pair graph, the event funnel emitted ZERO rows
(vs the oracle's three stage rows) when no user reached any stage,
and the grouping-sets family exposed a genuine engine split: Spark
emits no rows over an empty grouping input while DuckDB emits the SQL
standard's () grand-total row.  Adopted contracts: fixed-stage
reports always emit their stage rows (zero-valued); grouping-sets
queries use Spark-native "no data, no report rows" semantics with the
oracle mirroring via HAVING count(*) > 0 (which can only ever drop
the empty-input grand-total row — every real group has count >= 1).
The constant-key axis (every doc one lang+source, every event one
user+type) probed fully clean.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

_ORDER_COL = {
    "documents": "doc_id",
    "events": "event_id",
    "embeddings": "vec_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "nation": "n_nationkey",
    "region": "r_regionkey",
}

# previously-divergent ops + the rest of their families as sentinels
SINGLEROW_SAMPLE = [
    "ivf_cell_assignment",
    "ann_ivf_probe",
    "kmeans_embeddings",
    "funnel_view_click_purchase",
    "retention_weekly_cohorts",
    "pagerank_neardup_graph",
    "rollup_customers",
    "cube_lineitem_flags",
    "grouping_sets_revenue",
    "pivot_status_by_priority",
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "semantic_decontam_cells",
    # n = 1 drives the covariance (n-1) divisor to zero: both engines
    # must emit NULL cov rows, not crash
    "embedding_covariance",
    "gopher_quality_rules",
    "quality_classifier_score",
    "quality_classifier_trained",
    # round-4 additions: 1 doc owns all its grams (novelty 1.0, no
    # containment pairs); 1 vector means no centroid slice (the empty-
    # centroid guard) and an empty JL/canonical path
    "ngram_novelty_by_source",
    "novelty_incremental",
    "dedup_containment",
    "knn_label_agreement",
    "embedding_random_projection",
    "text_nfc_audit",
    # n = 1 nulls every covariance cell: the eigensolve must bail to
    # an EMPTY result on both engines, not emit NULL-score rows
    "pca_power_projection",
    "embedding_standardize",
    "sample_weighted_k",
    "source_unigram_divergence",
    "lang_confusion_matrix",
    "dedup_rep_weights",
    "graph_triangle_count",
    "events_decayed_activity",
    "text_pii_scrub",
    "quality_winsorize",
    "sketch_hll_distinct",
    "sketch_hll_incremental",
    "funnel_latency_quantiles",
    "mixture_temperature_weights",
    "events_rfm_segments",
    # round-6: 1 doc = 1 owner for every line (nothing dropped), a
    # 1-node pair graph is empty (degree dist empty), sd is NULL at
    # n=1 (norm screen flags nothing), a single event has no lag pair
    "dedup_lines_across_docs",
    "events_markov_transitions",
    "graph_degree_distribution",
    "text_readability",
    "embedding_norm_outliers",
    "minhash_signature_source_sim",
    "dedup_rate_by_source",
    "vocab_oov_rate_by_lang",
    "events_anomaly_mad",
    # round-7: one lineitem has no pair partner; one order has no lag
    # gap; a single event is one (user, type) and one active day; one
    # customer is every percentile cut at once; a 1-doc pair graph is
    # empty (component sizes empty); one type has no overlap pair; a
    # 1-source plan grants min(budget/tokens, cap) epochs; 1 doc = 1
    # entropy row; 1 vector leaves the ANN query set empty
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
    # round-7b: one doc is its own whole BM25 candidate set; chi2's
    # min-count floor empties on 1 doc; a 1-line basket has no pair
    # graph to peel; one vector seeds k=1 (b falls back to a -> s=0);
    # n=1 zeroes the OLS variance (NULL fit on both engines); a single
    # event is a lifetime-0 censored user
    "bm25_topk_retrieval",
    "chi2_discriminative_terms",
    "graph_kcore_parts",
    "kmeans_silhouette",
    "ols_discount_response",
    "user_survival_km",
    # round-7c: 1 doc = 1 calibration bin; 1 source has gini 0; a
    # single event has no transition (empty path table); the single
    # doc is incoming-or-base, never both (empty score set either way)
    "classifier_calibration_bins",
    "corpus_gini_balance",
    "user_path_entropy",
    "bm25_incremental_scoring",
    # round-8: one order/day has no lag partner (empty ACF join) and
    # is 100% of every share; one event is one PSI half (the other
    # smoothed), one arm, and one attribution row; one lineitem is a
    # zero-variance OLS (NULL slope); a 1-doc pair graph leaves the
    # leakage/purity tables empty; one vector fills one md5 half only
    # (drift row excluded on the exact-int guard)
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
    # round-8b: a 1-doc corpus has no candidate pair (zero-count
    # precision summary, empty hamming/affinity/assortativity
    # tables); one lineitem is one supplier row; one event is one
    # PSI-increment type with a one-sided smoothed term
    "part_affinity_topk",
    "graph_degree_assortativity",
    "dedup_minhash_precision",
    "simhash_hamming_profile",
    "supplier_scorecard",
    "events_psi_incremental",
    # round-8c: a single event is either the (start)>(start)>(start)
    # purchase path or no path at all; one order is a 100%-single
    # cohort with repeat_rate 0
    "events_conversion_paths",
    "orders_cohort_repeat_rate",
    # round-8d: one vector empties the IVF query set; a single event
    # is one slot with n_hours=1 (NULL z on the exact-int guard); one
    # user is a one-arm experiment (NULL CUPED z)
    "ivf_recall_report",
    "events_seasonal_anomaly",
    "events_ab_cuped",
    # round-8e: a 1-doc corpus has no pair graph (zero savings
    # everywhere); one vector is one query with an n=1 stats row
    # (sd NULL flags nothing); one image has no perceptual twin
    "dedup_token_savings",
    "knn_kdist_outliers",
    "mm_phash_dedup",
    # round-9: one event is one day with CUSUM exactly 0.0 (flagged);
    # one user makes all three quantiles the same single total; a
    # 1-doc corpus has no pair graph (empty local-cc table); one
    # vector has n=1 everywhere (all-NULL covariance -> NULL report)
    "events_cusum_changepoint",
    "quantiles_user_value_exact",
    "graph_local_clustering",
    "embedding_isotropy_report",
    # round-9b: one doc is one source's whole vocabulary (every token
    # hapax unless repeated in-doc); one order has no gap row; a
    # single event reaches at most the view stage
    "lexical_diversity_by_source",
    "orders_interarrival_burstiness",
    "funnel_time_bounded",
    # round-9c: one doc is one script profile row; one event is one
    # user with no gap (cv NULL, never flagged); a single event is at
    # most one arm's one-viewer funnel row
    "text_script_mix_audit",
    "user_bot_score",
    "funnel_by_arm",
]

CONSTANT_SAMPLE = [
    "cap_docs_per_source",
    "mixture_temperature_weights",
    "source_unigram_divergence",
    "lang_confusion_matrix",
    "quality_winsorize",
    "events_rfm_segments",
    "sketch_hll_distinct",
    "source_quota_incremental",
    "rebalance_by_lang",
    "source_mixture_weights",
    "stratified_split_report",
    "token_fertility_by_lang",
    "kmv_source_overlap",
    "events_sessionize",
    "funnel_view_click_purchase",
    "events_k_anonymity",
    "events_l_diversity",
    "gopher_quality_rules",
    "ngram_novelty_by_source",
    "text_nfc_audit",
    "events_hourly_anomaly",
    # round-6: one source collapses the pair outputs to empty
    # (signature sim, dup-rate keeps one group); a single event_type
    # gives a 1x1 markov matrix with p=1; constant keys are the MAD
    # screen's skew regime
    "minhash_signature_source_sim",
    "dedup_rate_by_source",
    "vocab_oov_rate_by_lang",
    "events_markov_transitions",
    "events_anomaly_mad",
    # round-7: a constant part key yields no a<b pair; a single event
    # type collapses the PMI/overlap pair sets to empty; a single
    # source takes the whole epoch budget
    "basket_part_pairs",
    "events_type_cooccurrence_pmi",
    "hll_event_type_overlap",
    "mixture_epoch_allocation",
    # round-7b: one source makes every term's in-slice share equal the
    # corpus share — the positive-association guard must empty the
    # chi2 output BEFORE the zero denominator is ever evaluated; one
    # constant user is a single (censored) KM lifetime
    "chi2_discriminative_terms",
    "user_survival_km",
    # round-7c: one source is the degenerate inequality case (G = 0);
    # one constant user is a single giant path
    "corpus_gini_balance",
    "user_path_entropy",
    # round-8: a constant event_type ('click') means zero purchases —
    # the A/B conversions and the attribution purchase set must empty
    # identically; one user collapses PSI to the single-type term; one
    # source makes every near-dup cluster pure; a constant date is the
    # zero-variance ACF (NULL on exact-int guard) and a single DOW row
    "events_ab_ztest",
    "events_attribution_last_touch",
    "events_psi_drift",
    "dedup_cluster_purity",
    "orders_autocorrelation",
    "orders_seasonality_dow",
    # round-8b: the fully-duplicated constant corpus is the candidate-
    # explosion regime for the precision report and the hamming
    # profile; a single event type is one smoothed PSI-increment term
    "dedup_minhash_precision",
    "simhash_hamming_profile",
    "events_psi_incremental",
    # round-8c: a constant 'click' stream has zero purchases — the
    # path table must empty identically on both engines
    "events_conversion_paths",
    # round-8d: one type x full calendar is the densest slot regime;
    # a single constant user is a one-arm CUPED (NULL z on the
    # exact-int guards)
    "events_seasonal_anomaly",
    "events_ab_cuped",
    # round-8e: one source takes ALL the savings (single group); the
    # constant corpus collapses every same-length payload to one
    # perceptual cluster
    "dedup_token_savings",
    "mm_phash_dedup",
    # round-9: a constant-value stream still has per-user totals
    # (count x value) — the quantiles stay well-defined; the constant
    # corpus is the max-clique regime where every local_cc is 1.0
    "quantiles_user_value_exact",
    "graph_local_clustering",
    # round-9b: one source carries the whole corpus's lexicon
    "lexical_diversity_by_source",
]


@pytest.fixture(scope="module")
def singlerow_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_singlerow")
    con = duckdb.connect()
    for t, key in _ORDER_COL.items():
        con.execute(
            f"""COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')
                ORDER BY {key} LIMIT 1)
              TO '{dst}/{t}.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    return str(dst)


@pytest.fixture(scope="module")
def constant_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_constant")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id, text, 'en' AS lang, 'src0' AS source,
              n_chars
            FROM read_parquet('{src}/documents.parquet'))
          TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT event_id, ts, CAST(1 AS BIGINT) AS user_id,
              'click' AS event_type, value, props
            FROM read_parquet('{src}/events.parquet'))
          TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in ("embeddings", "orders", "lineitem", "customer", "supplier",
              "part", "nation", "region"):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", SINGLEROW_SAMPLE)
def test_singlerow_oracle_agreement(spark, singlerow_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, singlerow_dir), o[name], singlerow_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", CONSTANT_SAMPLE)
def test_constant_key_oracle_agreement(spark, constant_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, constant_dir), o[name], constant_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


def test_funnel_emits_fixed_stages_on_stageless_stream(spark, singlerow_dir):
    """The fixed-stage report contract directly: a stream where no
    user reaches any stage still yields all three stage rows, zeroed."""
    from stac_geoparquet_spark.operators.funnel import (
        funnel_view_click_purchase,
    )

    rows = sorted(
        funnel_view_click_purchase(spark, singlerow_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_name"] for r in rows] == ["view", "click", "purchase"]
    assert all(r["users"] >= 0 for r in rows)
