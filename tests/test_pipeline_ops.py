"""Semantic invariants for the LLM-pipeline operators
(operators/pipeline.py) beyond the oracle hash gate."""

import os

import pytest
from pyspark.sql import functions as F

from stac_geoparquet_spark.operators import pipeline as P
from stac_geoparquet_spark.operators.text import TRAIN_PCT

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: a cached scan of documents.parquet would be
    # substituted (by plan-fragment match) into every later query over
    # the same file — including test_plans.py's column-pruning pins,
    # where the cached full-schema relation masks the parquet ReadSchema
    df = spark.read.parquet(os.path.join(SF, "documents.parquet")).cache()
    yield df
    df.unpersist()


def test_decontam_only_train_docs_flagged(spark, docs):
    out = P.decontaminate_against_holdout(spark, SF).collect()
    assert all(r.n_overlap >= 1 for r in out)
    flagged = {r.doc_id for r in out}
    holdout_ids = {
        r.doc_id
        for r in docs.select(
            "doc_id",
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                    16,
                    10,
                ).cast("bigint")
                % 100
            ).alias("pct"),
        ).collect()
        if r.pct >= TRAIN_PCT
    }
    assert not flagged & holdout_ids, "holdout docs must never be flagged"


def test_repetition_fracs_bounded(spark):
    out = P.quality_repetition(spark, SF).collect()
    assert out, "expected per-doc rows"
    for r in out:
        assert 0.0 < r.top_2gram_frac <= 1.0
        assert 0.0 <= r.dup_2gram_frac <= 1.0
        assert r.dup_2gram_frac == 0.0 or r.dup_2gram_frac >= r.top_2gram_frac or r.top_2gram_frac <= 0.5
        assert r.symbol_word_ratio >= 0.0
        # a doc with zero duplicate grams must pass the dup filter
        if r.dup_2gram_frac == 0.0 and r.top_2gram_frac <= P.TOP_2GRAM_MAX:
            assert r.passes_repetition_filter


def test_pack_bins_are_contiguous_and_cover_all_docs(spark, docs):
    bins = sorted(
        P.pack_sequences(spark, SF).collect(), key=lambda r: r.bin_id
    )
    n_docs = docs.count()
    assert sum(r.n_docs for r in bins) == n_docs
    # bins partition the doc_id order: ranges are non-overlapping and
    # consecutive bins touch or are adjacent in doc order
    for prev, cur in zip(bins, bins[1:]):
        assert prev.last_doc < cur.first_doc or prev.last_doc + 1 == cur.first_doc
        assert prev.last_doc < cur.last_doc
    # every bin's token payload is positive and close to the budget:
    # a bin only opens when the running sum crosses a budget boundary,
    # so each bin except the last spans >= 1 budget less the max doc
    total_tokens = sum(r.total_tokens for r in bins)
    assert total_tokens >= P.PACK_BUDGET * (len(bins) - 1)


def test_chunks_reassemble_to_original(spark, docs):
    chunks = P.chunk_documents(spark, SF)
    # per-doc: sum of chunk lengths minus overlaps == doc length
    agg = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("chunk_len").alias("len_sum"),
        F.max("chunk_idx").alias("max_idx"),
    )
    joined = agg.join(
        docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    ).collect()
    overlap = P.CHUNK_LEN - P.CHUNK_STRIDE
    assert joined
    for r in joined:
        assert r.max_idx == r.n - 1, "chunk_idx must be dense from 0"
        assert r.len_sum == r.n_chars + overlap * (r.n - 1), (
            f"doc {r.doc_id}: chunks must tile the text with fixed overlap"
        )


def test_chunk_bounds(spark):
    rows = P.chunk_documents(spark, SF).collect()
    for r in rows:
        assert 1 <= r.chunk_len <= P.CHUNK_LEN
        assert len(r.chunk_hash) == 16


def test_rebalance_keeps_all_of_smallest_lang(spark):
    out = {r.lang: r for r in P.rebalance_by_lang(spark, SF).collect()}
    assert out, "expected per-lang rows"
    min_before = min(r.n_before for r in out.values())
    for r in out.values():
        assert 0 < r.n_kept <= r.n_before
        if r.n_before == min_before:
            # keep fraction 1.0 -> threshold == RES -> every doc kept
            assert r.n_kept == r.n_before


def test_mixture_weights_normalize(spark):
    rows = P.source_mixture_weights(spark, SF).collect()
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.sqrt_weight for r in rows) - 1.0) < 1e-3
    # sqrt smoothing upweights small sources relative to raw share
    small = min(rows, key=lambda r: r.n_docs)
    big = max(rows, key=lambda r: r.n_docs)
    if small.n_docs < big.n_docs:
        assert small.sqrt_weight >= small.raw_share
        assert big.sqrt_weight <= big.raw_share


def test_yield_funnel_monotone(spark, sf_dir):
    """Each gate can only shrink the survivor set, and every doc is
    accounted for at stage 0."""
    from stac_geoparquet_spark.operators.pipeline import corpus_yield_funnel

    rows = sorted(
        corpus_yield_funnel(spark, sf_dir).collect(),
        key=lambda r: r["stage_id"],
    )
    assert [r["stage"] for r in rows] == [
        "all", "length", "repetition", "exact_dedup", "train_split",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:]))
