"""NULL-injection differential gate: run Spark and the DuckDB oracle
over a copy of the corpus with NULL text/lang/source/props rows (production
data has them; the driver's synthetic tables do not) and require
agreement. This found four real divergences and three decode crashes:
Spark's window grouped NULL shingle hashes into a fake duplicate
class, array_distinct kept a [NULL] fingerprint DuckDB's list_distinct
drops, a NULL token count shifted packing bins differently per engine,
simhash emitted degenerate rows the oracle dropped, and the multimodal
decoders crashed on NULL payloads. The affected operators now share an
explicit contract (NULL-text docs are excluded from per-doc
fingerprint/span/media outputs; packing counts them as 0 tokens) and
this file keeps them honest."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

# previously-diverging operators + one healthy representative per
# family (full differential sweep is a dev-time probe; this is the
# regression core)
SAMPLE = [
    "dedup_simhash",
    "decontam_bloom_semijoin",
    "dsir_importance_weights",
    "select_token_budget",
    "cap_docs_per_source",
    "text_bigram_entropy",
    "pack_sequences",
    "dedup_substring_spans",
    "dedup_substring_removal",
    "fingerprint_winnowing",
    "mm_image_features",
    "mm_resize",
    "mm_audio_energy",
    "mm_media_manifest",
    "text_token_count",
    "dedup_minhash_lsh",
    "corpus_yield_funnel",
    "events_json_extract",
    "source_quota_incremental",
    "kmv_source_overlap",
    "rebalance_by_lang",
    "source_mixture_weights",
    "gopher_quality_rules",
    "quality_classifier_score",
    "quality_classifier_trained",
    "text_pii_scrub",
    "sample_weighted_k",
    "source_unigram_divergence",
    "lang_confusion_matrix",
    "dedup_rep_weights",
    "quality_winsorize",
    "mixture_temperature_weights",
    # round-4: NULL text tokenizes to no shingles (novelty/containment
    # drop the doc on both engines); NULL lang groups must agree in
    # the NFC audit rollup
    "ngram_novelty_by_source",
    "novelty_incremental",
    "dedup_containment",
    "text_nfc_audit",
    # round-6 doc-table ops: NULL text excluded (lines/readability),
    # NULL lang/source must group identically in the rollups
    "dedup_lines_across_docs",
    "text_readability",
    "vocab_oov_rate_by_lang",
    "minhash_signature_source_sim",
    # round-8: NULL text shingles to nothing, so a NULL-text doc joins
    # no pair — the leakage and purity tables must drop it identically
    "split_leakage_audit",
    "dedup_cluster_purity",
    # round-8b: candidate generation and the simhash fingerprint both
    # exclude NULL-text docs explicitly
    "dedup_minhash_precision",
    "simhash_hamming_profile",
    "graph_degree_assortativity",
    # round-8e: NULL text counts 0 tokens and joins no pair; NULL
    # source groups must agree in the savings rollup; a NULL-text doc
    # synthesizes no payload
    "dedup_token_savings",
    "mm_phash_dedup",
    # round-7b: NULL text carries no tokens (BM25 candidates, chi2
    # presence); NULL source must be excluded from the chi2 slices
    "bm25_topk_retrieval",
    "chi2_discriminative_terms",
    # round-12: NULL text leaves the graded corpus and the df counts;
    # the hybrid's lexical side shares the contract (its cos side is
    # text-blind by construction)
    "bm25_ndcg_report",
    "hybrid_rrf_retrieval",
    # round-12b: NULL text leaves the QL length norm and postings; a
    # NULL-text doc contributes no tokens to the Heaps prefixes but
    # its id still moves the cutoff grid — both engines share both
    "ql_dirichlet_topk",
    "text_heaps_law_fit",
    # round-12c: NULL text leaves the feedback term models, the MATTR
    # rows, and the classifier/Gopher score join identically
    "rm3_expansion_terms",
    "text_mattr_diversity",
    "classifier_lift_gains",
    # round-7c: NULL prob docs leave the calibration bins; NULL source
    # leaves the gini mass; NULL text scores nothing incrementally
    "classifier_calibration_bins",
    "corpus_gini_balance",
    "bm25_incremental_scoring",
    # round-7 doc-table ops: NULL text explodes to no tokens
    # (entropy / epoch counts); the component histogram rides the
    # minhash pair graph's NULL handling
    "text_token_entropy",
    "mixture_epoch_allocation",
    "graph_component_sizes",
    "dedup_rate_by_source",
    # round-9: NULL text tokenizes to nothing; NULL source must group
    # identically in the per-source rollup; NULL-text docs are
    # excluded from the script audit
    "lexical_diversity_by_source",
    "text_script_mix_audit",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_nulls")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS text,
              CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
              CASE WHEN doc_id % 13 = 0 THEN NULL ELSE source END AS source,
              n_chars
            FROM read_parquet('{src}/documents.parquet'))
          TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT event_id, ts, user_id, event_type, value,
              CASE WHEN event_id % 13 = 0 THEN NULL ELSE props END AS props
            FROM read_parquet('{src}/events.parquet'))
          TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "embeddings",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", SAMPLE)
def test_null_injected_oracle_agreement(spark, null_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(q[name](spark, null_dir), o[name], null_dir, strict=True)
    assert ok, f"{name}: {msg}"


VEC_SAMPLE = [
    "knn_brute_force",
    "hard_negative_mining",
    "matryoshka_recall_report",
    "ann_lsh_bucketed",
    "ann_recall_report",
    "ann_ivf_probe",
    "ann_pq_adc",
    "pq_encode_codes",
    "ivf_cell_assignment",
    "dedup_embedding_cosine",
    "semdedup_cells",
    "semdedup_incremental",
    "embedding_covariance",
    "knn_label_agreement",
    "embedding_random_projection",
    "pca_power_projection",
    # round-6: the norm screen rides the same valid-vector contract
    "embedding_norm_outliers",
    # round-7b: the silhouette eval rides the kmeans fit contract
    "kmeans_silhouette",
    # round-8: the drift screen shares the valid-vector contract
    "embedding_centroid_drift",
    # round-8d: the IVF recall eval rides the same contract through
    # both of its composed inputs
    "ivf_recall_report",
    # round-8e: the k-distance screen rides the brute-force contract
    "knn_kdist_outliers",
    # round-12: whitening rides the covariance contract end-to-end
    "embedding_whitening_report",
]


@pytest.fixture(scope="module")
def null_vec_dir(tmp_path_factory):
    """Embeddings with NULL rows (a failed embedder) — these crashed
    every driver-side loader and worker closure before the excluded-
    on-both-engines contract."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_nullvec")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT vec_id,
              CASE WHEN vec_id % 9 = 5 THEN NULL ELSE embedding END
                AS embedding,
              label
            FROM read_parquet('{src}/embeddings.parquet'))
          TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "documents",
        "events",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", VEC_SAMPLE)
def test_null_embedding_oracle_agreement(spark, null_vec_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, null_vec_dir), o[name], null_vec_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


@pytest.fixture(scope="module")
def nan_vec_dir(tmp_path_factory):
    """Embeddings where some vectors are all-NaN — cross-engine NaN
    ordering semantics diverge wildly, so the finite-vector contract
    excludes such rows on both engines."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_nanvec")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT vec_id,
              CASE WHEN vec_id % 17 = 3
                   THEN list_transform(embedding,
                                       x -> CAST('NaN' AS FLOAT))
                   ELSE embedding END AS embedding,
              label
            FROM read_parquet('{src}/embeddings.parquet'))
          TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "documents",
        "events",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize(
    "name",
    VEC_SAMPLE + ["kmeans_embeddings", "embedding_quantize_int8",
                  "embedding_class_profile"],
)
def test_nan_embedding_oracle_agreement(spark, nan_vec_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, nan_vec_dir), o[name], nan_vec_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


@pytest.fixture(scope="module")
def ragged_vec_dir(tmp_path_factory):
    """Embeddings where some vectors have the wrong dimension (corrupt
    rows) — the valid-vector contract excludes them on both engines
    (len(embedding) = DIM)."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_ragged")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT vec_id,
              CASE WHEN vec_id % 23 = 11 THEN embedding[1:32]
                   ELSE embedding END AS embedding,
              label
            FROM read_parquet('{src}/embeddings.parquet'))
          TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "documents",
        "events",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize(
    "name",
    VEC_SAMPLE + ["kmeans_embeddings", "embedding_quantize_int8",
                  "embedding_class_profile"],
)
def test_ragged_embedding_oracle_agreement(spark, ragged_vec_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, ragged_vec_dir), o[name], ragged_vec_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


def test_dq_corpus_report_counts_injected_violations(
    spark, null_dir, null_vec_dir, nan_vec_dir, ragged_vec_dir
):
    """The corpus validity report (the promote/abort gate for exactly
    the contracts these fixtures violate) must count each injected
    corruption — and report all-zeros on clean data."""
    from stac_geoparquet_spark.operators.quality import dq_corpus_report

    def failed(d):
        return {r["check"]: r["failed"] for r in dq_corpus_report(spark, d).collect()}

    clean = failed("/root/testdata/sf0.001")
    assert all(v == 0 for v in clean.values()), clean

    assert failed(null_dir)["doc_null_text"] > 0
    assert failed(null_vec_dir)["vec_null"] > 0
    assert failed(nan_vec_dir)["vec_nonfinite"] > 0
    assert failed(ragged_vec_dir)["vec_wrong_dim"] > 0


REL_SAMPLE = [
    "moving_avg_daily_revenue",  # the found NULL-ordering divergence
    "q3_shipping_priority",
    "q13_customer_distribution",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "window_topk_orders_per_customer",
    "gapfill_hourly_purchases",
    "dq_report",
    # round-7: NULL keys excluded before the basket distinct (the
    # count-DISTINCT divergence), NULL dates before the lag window
    # (the NULL-ordering divergence), NULL prices skipped by sum /
    # percentile identically
    "basket_part_pairs",
    "customer_interpurchase",
    "orders_pareto_share",
    # round-8: NULL dates carry no time-axis position (ACF / DOW /
    # lead-time x), NULL keys join nothing, NULL prices have no
    # leading digit — excluded explicitly on both engines
    "orders_autocorrelation",
    "orders_seasonality_dow",
    "supplier_leadtime_trend",
    "orders_benford_digit",
    # round-8b: NULL basket/supplier keys carry no entity
    "part_affinity_topk",
    "supplier_scorecard",
    # round-8c: NULL custkey/date rows carry no cohort identity
    "orders_cohort_repeat_rate",
    # round-9: NULL custkey/date rows carry no gap position
    "orders_interarrival_burstiness",
]


@pytest.fixture(scope="module")
def null_rel_dir(tmp_path_factory):
    """Orders/lineitem with NULL keys, dates, and measures — found the
    NULL-ordering divergence in the moving-average window (Spark sorts
    NULLs first, DuckDB last)."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_nullrel")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT o_orderkey,
              CASE WHEN o_orderkey % 31 = 17 THEN NULL ELSE o_custkey END
                AS o_custkey,
              o_orderstatus, o_totalprice,
              CASE WHEN o_orderkey % 37 = 5 THEN NULL ELSE o_orderdate END
                AS o_orderdate,
              o_orderpriority
            FROM read_parquet('{src}/orders.parquet'))
          TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
              l_quantity, l_extendedprice,
              CASE WHEN l_orderkey % 29 = 3 THEN NULL ELSE l_discount END
                AS l_discount,
              l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'))
          TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "documents",
        "events",
        "embeddings",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", REL_SAMPLE)
def test_null_relational_oracle_agreement(spark, null_rel_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, null_rel_dir), o[name], null_rel_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


@pytest.fixture(scope="module")
def null_elem_dir(tmp_path_factory):
    """Vectors of correct length with one NULL ELEMENT (partial
    embedder failure) — the subtle case: DuckDB's list_sum SKIPS NULL
    elements while Spark's fold propagates them, so without the
    contract's element-count term the engines disagree on whether the
    row is valid."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_nullelem")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT vec_id,
              CASE WHEN vec_id % 13 = 4
                   THEN list_concat(embedding[1:63],
                                    [CAST(NULL AS FLOAT)])
                   ELSE embedding END AS embedding,
              label
            FROM read_parquet('{src}/embeddings.parquet'))
          TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "documents",
        "events",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize(
    "name",
    VEC_SAMPLE + ["kmeans_embeddings", "embedding_quantize_int8",
                  "embedding_class_profile", "dq_corpus_report"],
)
def test_null_element_oracle_agreement(spark, null_elem_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, null_elem_dir), o[name], null_elem_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


def test_null_element_counted_invalid(spark, null_elem_dir):
    from stac_geoparquet_spark.operators.quality import dq_corpus_report

    counts = {
        r["check"]: r["failed"]
        for r in dq_corpus_report(spark, null_elem_dir).collect()
    }
    assert counts["vec_nonfinite"] > 0




@pytest.fixture(scope="module")
def empty_text_dir(tmp_path_factory):
    """Empty-string documents (n_chars = 0) — under Spark 4's ANSI
    default, an unguarded ratio division CRASHES the job while the
    oracle emits a row (confirmed on text_quality_score)."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_emptytext")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id,
              CASE WHEN doc_id % 11 = 3 THEN '' ELSE text END AS text,
              lang, source, n_chars
            FROM read_parquet('{src}/documents.parquet'))
          TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "events",
        "embeddings",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize(
    "name",
    ["text_quality_score", "text_token_count", "text_fingerprint",
     "quality_repetition", "corpus_yield_funnel", "chunk_documents"],
)
def test_empty_text_oracle_agreement(spark, empty_text_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, empty_text_dir), o[name], empty_text_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


# ---------------------------------------------------------------------------
# weird-whitespace / unicode probe axis: tabs, newlines, repeated
# spaces, leading/trailing whitespace, whitespace-only docs, NBSP and
# CJK text.  The tokenizer contract (split(lower(trim(text)), '\s+'))
# must agree between Java regex (Spark) and RE2 (DuckDB) on all of
# them — \s is the ASCII class in both, NBSP is a word char in
# neither's \s, and a whitespace-only doc trims to '' whose split
# yields [''] on both engines.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def weird_ws_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_weird_ws")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id,
              CASE doc_id % 12
                WHEN 0 THEN replace(text, ' ', chr(9))
                WHEN 1 THEN replace(text, ' ', chr(10))
                WHEN 2 THEN replace(text, ' ', '   ')
                WHEN 3 THEN '   ' || text || chr(9) || chr(10)
                WHEN 4 THEN '  ' || chr(9) || chr(10) || ' '
                WHEN 5 THEN replace(text, ' ', chr(160))
                WHEN 6 THEN '日本語 テスト ' || text
                WHEN 7 THEN chr(160) || text || chr(160)
                WHEN 8 THEN replace(text, ' ', chr(11))
                WHEN 9 THEN 'İstanbul ixİI ' || text || ' İ'
                WHEN 10 THEN chr(1) || text || chr(31)
                ELSE text END AS text,
              lang, source, n_chars
            FROM read_parquet('{src}/documents.parquet'))
          TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "embeddings",
        "events",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


WS_SAMPLE = SAMPLE + [
    # round-10: the encoder's word stream and the pack identity
    # (stream fold == word tokens + separators) are exactly the
    # contracts edge-whitespace attacks — the fixture caught the
    # ASCII-only F.trim leading-space token divergence in
    # pack_sequences' first draft
    "tokenize_bpe_encode",
    "tokenize_bpe_roundtrip",
    # round-12: the Viterbi DP shares the same word-stream contract
    "tokenize_unigram_eval",
    "split_unigram_jsd",
    "text_quality_score",
    "text_lang_id",
    "quality_repetition",
    "text_unigram_logppl",
    "vocab_top_terms",
    "doc_length_buckets",
    "decontaminate_against_holdout",
    "chunk_documents",
]


@pytest.mark.parametrize("name", sorted(set(WS_SAMPLE)))
def test_weird_whitespace_oracle_agreement(spark, weird_ws_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, weird_ws_dir), o[name], weird_ws_dir, strict=True
    )
    assert ok, f"{name}: {msg}"


# ---------------------------------------------------------------------------
# malformed-props probe axis: production event payloads carry broken
# JSON, non-integer values, duplicate keys, arrays — the extraction
# must yield NULL on both engines, never crash (Spark's bare cast threw
# under ANSI on '{"k": 2.9}'; DuckDB's ->> throws on invalid JSON).
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def malformed_props_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_badjson")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT event_id, ts, user_id, event_type, value,
              CASE event_id % 17
                WHEN 0 THEN '{{'
                WHEN 1 THEN ''
                WHEN 2 THEN 'not json'
                WHEN 3 THEN '{{"k": 2.9}}'
                WHEN 4 THEN '{{"k": [1, 2]}}'
                WHEN 5 THEN '{{"k": "7"}}'
                WHEN 6 THEN '{{"k": null}}'
                WHEN 7 THEN '{{"k": 1e2}}'
                WHEN 8 THEN NULL
                WHEN 9 THEN '{{"k": " 42 "}}'
                WHEN 10 THEN '{{"k": "' || chr(11) || '7"}}'
                WHEN 11 THEN '{{"k": 1, "k": 2}}'
                WHEN 12 THEN '{{"k": "+08"}}'
                -- structural whitespace between tokens: VALID JSON
                -- (json_valid = true, ->> extracts) but raw controls,
                -- so the shared control-char contract nulls it on BOTH
                -- engines (advisor finding, round 4)
                WHEN 13 THEN '{{"k":' || chr(10) || '1}}'
                WHEN 14 THEN '{{"k":' || chr(9) || '2}}'
                WHEN 15 THEN chr(13) || chr(10) || '{{"k": 3}}'
                ELSE props END AS props
            FROM read_parquet('{src}/events.parquet'))
          TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "documents",
        "embeddings",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_malformed_props_oracle_agreement(spark, malformed_props_dir):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q["events_json_extract"](spark, malformed_props_dir),
        o["events_json_extract"],
        malformed_props_dir,
        strict=True,
    )
    assert ok, f"events_json_extract: {msg}"


# ---------------------------------------------------------------------------
# unicode-injection probe axis (round 4): astral-plane (surrogate-pair),
# combining-mark, and CJK text stresses cross-engine substring/length
# parity — the tile/chunk/shingle family indexes INTO text by character
# position, so a codepoint-vs-code-unit divergence would silently shift
# every span boundary.
# ---------------------------------------------------------------------------
UNICODE_SAMPLE = [
    "dedup_substring_removal",
    "dedup_substring_spans",
    "chunk_documents",
    "fingerprint_winnowing",
    "text_token_count",
    "text_quality_score",
    "cap_docs_per_source",
    "mm_resize",
    # round-9: astral emoji stress the BMP-range class counts +
    # codepoint length parity; CJK rows must flag as CJK-dominant
    "text_script_mix_audit",
    "lexical_diversity_by_source",
]


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_unicode")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id,
              CASE doc_id % 5
                WHEN 0 THEN repeat('\U0001F600á', 30)
                WHEN 1 THEN repeat('你好 ', 25) || text[1:40]
                WHEN 2 THEN '\U0001F680' || text
                ELSE text END AS text,
              lang, source, n_chars
            FROM read_parquet('{src}/documents.parquet'))
          TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "events",
        "embeddings",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", UNICODE_SAMPLE)
def test_unicode_injected_oracle_agreement(spark, unicode_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(q[name](spark, unicode_dir), o[name], unicode_dir, strict=True)
    assert ok, f"{name}: {msg}"


# ---------------------------------------------------------------------------
# events-NULL probe axis (round 4): NULL ts/user_id/event_type/value —
# production event streams carry all four.  Found a real divergence:
# gapfill's LOCF treated an hour whose purchases all carry NULL value
# differently per engine (Spark emitted NULL revenue/locf where the
# oracle coalesced to 0 and carried the last KNOWN revenue), and a
# NULL-ts purchase would seed Spark's LOCF chain while the oracle's
# calendar join dropped it.
# ---------------------------------------------------------------------------
EVENTS_SAMPLE = [
    # round-5 event/sketch ops (the r04-era duplicate of this gate
    # shadowed an earlier same-named test; lists are now merged here)
    "events_decayed_activity",
    "funnel_latency_quantiles",
    "events_rfm_segments",
    "sketch_hll_distinct",
    "sketch_hll_incremental",
    "gapfill_hourly_purchases",
    "events_hourly_rollup",
    "events_hourly_anomaly",
    "events_sessionize",
    "events_session_window",
    "events_json_extract",
    "events_k_anonymity",
    "asof_last_click_before_purchase",
    "moving_avg_daily_revenue",
    "rolling_24h_user_value",
    "range_join_clicks_before_purchase",
    "funnel_view_click_purchase",
    "retention_weekly_cohorts",
    "sketch_kmv_distinct",
    "sketch_cms_heavy_hitters",
    # round-6: NULL user_id/ts/event_type rows carry no sequence
    # identity (markov) and no hour bucket (MAD screen) — excluded on
    # both engines
    "events_markov_transitions",
    "events_anomaly_mad",
    # round-7: NULL user/type carries no co-occurrence identity (PMI,
    # HLL overlap); NULL ts/user has no activity day (DAU/WAU)
    "events_type_cooccurrence_pmi",
    "events_dau_wau",
    "hll_event_type_overlap",
    # round-7b: NULL user/ts rows carry no lifetime identity
    "user_survival_km",
    # round-7c: NULL user/ts/type rows carry no path identity
    "user_path_entropy",
    # round-8: NULL ts/type rows carry no drift position or class;
    # NULL user carries no arm or sequence identity
    "events_psi_drift",
    "events_ab_ztest",
    "events_attribution_last_touch",
    # round-8b: NULL id/type rows carry no slice or class
    "events_psi_incremental",
    # round-8c: NULL user/ts/type rows carry no path identity
    "events_conversion_paths",
    # round-8d: NULL ts/type rows carry no hour bucket; NULL user/ts
    # rows carry no arm or period
    "events_seasonal_anomaly",
    "events_ab_cuped",
    # round-9: NULL ts rows carry no day position (CUSUM); NULL
    # user/value rows carry no per-user total (exact quantiles);
    # NULL user/ts rows carry no funnel position or gap identity
    "events_cusum_changepoint",
    "quantiles_user_value_exact",
    "funnel_time_bounded",
    "user_bot_score",
    "funnel_by_arm",
    # round-12: NULL user/value/type rows carry no per-(type, user)
    # cell; the BH rank set shrinks identically on both engines
    "events_fdr_bh",
    # round-12b: NULL user/value rows carry no per-user total on
    # either side of the ratio/bootstrap scaffolds
    "events_ratio_metric_delta",
    "events_bootstrap_ci",
]


@pytest.fixture(scope="module")
def null_events_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_nullevents")
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT event_id,
              CASE WHEN event_id % 17 = 0 THEN NULL ELSE ts END AS ts,
              CASE WHEN event_id % 19 = 0 THEN NULL ELSE user_id END
                AS user_id,
              CASE WHEN event_id % 23 = 0 THEN NULL ELSE event_type END
                AS event_type,
              CASE WHEN event_id % 29 = 0 THEN NULL ELSE value END AS value,
              props
            FROM read_parquet('{src}/events.parquet'))
          TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "documents",
        "embeddings",
        "orders",
        "lineitem",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    ):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", EVENTS_SAMPLE)
def test_null_events_oracle_agreement(spark, null_events_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(
        q[name](spark, null_events_dir), o[name], null_events_dir, strict=True
    )
    assert ok, f"{name}: {msg}"
