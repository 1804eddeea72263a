"""Duplicate-id differential gate: run Spark and the DuckDB oracle
over copies of the tables containing re-ingested ids — exact duplicate
rows plus same-id-different-payload conflicts — and require agreement.
Production corpora are re-ingested; the driver's synthetic tables are
not, so this axis is invisible to the correctness gate.

The probe that seeded this file found 20 divergent operators: per-id
outputs drifting in multiplicity (IVF assignment, PQ codes, SemDeDup,
simhash, substring removal), double-weighted k-means means, duplicate
neighbors crowding ANN top-k, shingle-set sizes counting duplicate
rows, packing bins shifting, quota/cap selections flagging dup rows
inconsistently, and the events range join emitting collapsed purchase
groups on one engine only.  The fix is the canonical-by-id contract in
operators/_canon.py (id-keyed operators consume one row per id — the
min-payload-tuple winner, NULLS LAST — while row-level multiset scans
stay raw); this file keeps both sides on it.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

# the 20 previously-divergent operators + one healthy representative
# per family (raw-multiset contract: knn, text, exact dedup, TPC-H agg)
SAMPLE = [
    # documents family (canonical corpus)
    "dedup_ngram_jaccard",
    "dedup_rep_weights",
    "graph_triangle_count",
    "dedup_minhash_lsh",
    "dedup_cluster_cc",
    "dedup_simhash",
    "dedup_survivors",
    "dedup_substring_removal",
    "quality_repetition",
    "pack_sequences",
    "corpus_yield_funnel",
    "cap_docs_per_source",
    "source_quota_incremental",
    "decontam_bloom_semijoin",
    "decontaminate_against_holdout",
    "pagerank_neardup_graph",
    # round-7b canon consumers: a re-ingested doc_id must score/df
    # once (BM25) and count once per slice (chi2)
    "bm25_topk_retrieval",
    "chi2_discriminative_terms",
    "bm25_incremental_scoring",
    "classifier_calibration_bins",
    "mm_image_features",
    "mm_media_manifest",
    "mm_cdc_chunk_dedup",
    # vector family (canonical index builds)
    "ivf_cell_assignment",
    "embedding_standardize",
    "ann_ivf_probe",
    "kmeans_embeddings",
    "kmeans_silhouette",
    "pq_encode_codes",
    "ann_pq_adc",
    "semdedup_cells",
    "semdedup_incremental",
    "dedup_embedding_cosine",
    "knn_label_agreement",
    "embedding_random_projection",
    "pca_power_projection",
    # documents family, round-4 additions (novelty's min-owner and
    # containment's candidate sets both key on doc_id)
    "ngram_novelty_by_source",
    "novelty_incremental",
    "dedup_containment",
    # round-6: line ownership / dup-rate / norm screen all key on the
    # canonical id; the markov lag order keys on canonical event_id
    "dedup_lines_across_docs",
    "dedup_rate_by_source",
    "embedding_norm_outliers",
    # round-7: source signature now reads the canonical corpus (r06
    # ADVICE — dup ids with different payloads polluted the signature)
    "minhash_signature_source_sim",
    # events family (canonical event log)
    "events_markov_transitions",
    "range_join_clicks_before_purchase",
    # round-8: the attribution carry-forward keys on the canonical
    # (ts, event_id) order; leakage/purity ride the canonical pair
    # graph; the drift halves key on the canonical vec_id
    "events_attribution_last_touch",
    "split_leakage_audit",
    "dedup_cluster_purity",
    "embedding_centroid_drift",
    # round-8b: candidates/fingerprints/degrees all derive from the
    # canonical doc pipeline
    "dedup_minhash_precision",
    "simhash_hamming_profile",
    "graph_degree_assortativity",
    # round-9: corners/degrees derive from the canonical pair graph;
    # the isotropy report rides the canonical-by-id covariance
    "graph_local_clustering",
    "embedding_isotropy_report",
    # round-8c: the 3-lag path keys on the canonical (ts, event_id)
    # order
    "events_conversion_paths",
    # round-8d: the IVF side reads the canonical index build
    "ivf_recall_report",
    # round-8e: savings key on the canonical corpus + cluster labels;
    # the asset store is keyed (one payload per canonical doc_id)
    "dedup_token_savings",
    "mm_phash_dedup",
    # round-10: every URL op keys on the canonical doc_id (the
    # synthetic URL itself derives from it); LPA rides the canonical
    # pair graph; the encoder's per-source weights aggregate the raw
    # multiset on BOTH sides while its merge vocab is raw-corpus too
    "url_normalize_audit",
    "cap_docs_per_domain",
    "robots_disallow_filter",
    "graph_lpa_communities",
    "tokenize_bpe_encode",
    "tokenize_bpe_roundtrip",
    "graph_modularity_score",
    "dedup_url_canonical",
    # round-11: the cluster split keys on the canonical doc set (the
    # oracle walks DOCS_CANON docs); domain diversity derives the URL
    # from the canonical doc_id
    "split_by_neardup_cluster",
    "domain_effective_diversity",
    # round-12: ranking + grades key on the canonical corpus (a
    # re-ingested duplicate must contribute one df/grade row and one
    # ranked position); whitening keys on the canonical covariance
    "bm25_ndcg_report",
    "embedding_whitening_report",
    "graph_hyperball_reach",
    "graph_harmonic_centrality",
    "events_fdr_bh",
    "hybrid_rrf_retrieval",
    # raw-multiset convention (the tokenize_bpe_encode precedent: the
    # per-source weights aggregate the raw stream on BOTH sides)
    "tokenize_unigram_eval",
    # round-12b: QL scores the canonical corpus (a re-ingested doc_id
    # scores once, its ctf counts once); Heaps first-occurrence and
    # prefix token counts run the raw multiset identically on both
    # engines; the user-keyed experiment readouts collapse duplicate
    # event rows into the same per-user totals on both sides
    "ql_dirichlet_topk",
    "text_heaps_law_fit",
    "events_ratio_metric_delta",
    "events_bootstrap_ci",
    # round-12c: RM3 feeds from the canonical BM25 feedback set (a
    # re-ingested doc_id contributes one term model); the lift walk
    # rides the canonical classifier/Gopher scores; MATTR reports the
    # raw multiset row-for-row on both engines
    "rm3_expansion_terms",
    "text_mattr_diversity",
    "classifier_lift_gains",
    # duplicate orders merge into the same daily state; the frame
    # stream keys on the canonical asset store
    "ewma_control_incremental",
    "mm_scene_cuts",
    # raw-multiset representatives (must stay consistent WITHOUT
    # canonicalization — a regression here means someone canonicalized
    # one side only)
    "knn_brute_force",
    "text_token_count",
    "dedup_exact",
    "q1_pricing_summary",
    "events_sessionize",
]


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_dup_ids")
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{src}/documents.parquet')
          UNION ALL
          SELECT * FROM read_parquet('{src}/documents.parquet')
          WHERE doc_id % 41 = 7
          UNION ALL
          SELECT doc_id, text || ' v2' AS text, lang,
                 'reingest' AS source, n_chars + 3 AS n_chars
          FROM read_parquet('{src}/documents.parquet')
          WHERE doc_id % 43 = 9
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{src}/embeddings.parquet')
          UNION ALL
          SELECT * FROM read_parquet('{src}/embeddings.parquet')
          WHERE vec_id % 41 = 7
          UNION ALL
          SELECT vec_id, embedding, (label + 1) % 10 AS label
          FROM read_parquet('{src}/embeddings.parquet')
          WHERE vec_id % 43 = 9
          UNION ALL
          -- different-PAYLOAD duplicate ids, including INCOMING ids
          -- (vec_id % 50 == 0): at-least-once re-delivery with a
          -- changed vector must collapse via min(embedding) on every
          -- path, batch and incremental (the sf0.01 dup-id sweep
          -- caught the incremental reader keeping both copies)
          SELECT vec_id, list_transform(embedding, x -> -x) AS embedding,
                 label
          FROM read_parquet('{src}/embeddings.parquet')
          WHERE vec_id % 25 = 0
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{src}/events.parquet')
          UNION ALL
          SELECT * FROM read_parquet('{src}/events.parquet')
          WHERE event_id % 41 = 7
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (
          SELECT * FROM read_parquet('{src}/orders.parquet')
          UNION ALL
          SELECT * FROM read_parquet('{src}/orders.parquet')
          WHERE o_orderkey % 41 = 7
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in ("lineitem", "customer", "supplier", "part", "nation", "region"):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"), str(dst / f"{t}.parquet")
        )
    return str(dst)


@pytest.mark.parametrize("name", SAMPLE)
def test_dup_id_oracle_agreement(spark, dup_dir, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry_mod

    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    ok, msg = compare(q[name](spark, dup_dir), o[name], dup_dir, strict=True)
    assert ok, f"{name}: {msg}"


def test_canonical_rows_winner_rule(spark):
    """The contract itself: min payload tuple, per-column NULLS LAST —
    a usable payload beats NULL, conflicts resolve row-consistently."""
    from stac_geoparquet_spark.operators._canon import canonical_rows

    df = spark.createDataFrame(
        [
            (1, "b", "en"),
            (1, "a", "zz"),  # winner: min text, lang rides along
            (2, None, "en"),
            (2, "x", None),  # winner: non-NULL text beats NULL text
            (3, None, None),  # all-NULL payload still yields one row
        ],
        "id bigint, text string, lang string",
    )
    got = {
        r["id"]: (r["text"], r["lang"])
        for r in canonical_rows(df, "id", ("text", "lang")).collect()
    }
    assert got == {1: ("a", "zz"), 2: ("x", None), 3: (None, None)}
