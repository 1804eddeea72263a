"""Incremental first-occurrence novelty: new documents arrive as a
stream and are scored against a STATIC index of the existing corpus's
distinct shingle hashes — the ingest-time shape of the batch
``dedup.ngram_novelty_by_source`` valuation.  An incoming document's
novelty is the fraction of its distinct shingles the corpus has never
seen; admission pipelines use it to rate-limit scrapey mirrors at the
door instead of paying full dedup downstream.

Shares the dedup family's single shingle/hash definition
(``dedup._shingles_from_words`` + the md5/conv 60-bit hash), so a
document's grams never differ between the batch sweep, the MinHash
index, and this stream.

Scale contract: unlike the decontam holdout (a benchmark suite, tiny,
broadcastable), the gram index here is CORPUS-sized — production
persists it as a bucketed-by-``shash`` table so each micro-batch's
probe is a co-located shuffle join of a batch-sized left side against
the bucketed static side (the same layout argument as
``streaming/dedup.band_index``).  The stream side is stateless: in-row
``array_distinct`` shingling, hash post-explode, stream-static join;
per-doc aggregation is left to the consumer (a doc's gram rows arrive
in one micro-batch, so a foreachBatch aggregate is exact).

``novelty_incremental`` is the batch-mode entry (incoming = doc_id %
INCOMING_MOD == 0, the family's shared stand-in split) and is exactly
oracle-checked; ``stream_novelty_against_index`` runs the identical
pipeline from ``readStream`` (stream == batch tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stac_geoparquet_spark.operators.dedup import (
    _SHINGLE_CTE,
    _SHINGLE_HASH_CTE,
    _hashed_shingles,
    _shingles_from_words,
)
from stac_geoparquet_spark.operators.text import _words
from stac_geoparquet_spark.streaming.dedup import DOCS_SCHEMA, INCOMING_MOD


def corpus_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static side: DISTINCT shingle hashes of the existing corpus
    (everything that is not the incoming stand-in split).  Reuses the
    session's cached shingle table, so the index build shares the one
    per-corpus tokenize+hash pass every dedup operator already pays."""
    shh = _hashed_shingles(spark, sf_dir)
    return (
        shh.filter(F.col("doc_id") % INCOMING_MOD != 0)
        .select("shash")
        .distinct()
    )


def _incoming_gram_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, shash) for incoming docs with per-doc-distinct grams,
    shingled fully in-row and hashed AFTER the explode (codegen-side,
    the dedup module's measured shape) — stateless and stream-safe."""
    sh = docs.select(
        "doc_id", _words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.explode(_shingles_from_words(F.col("w"))).alias("shingle"),
    )
    v = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return sh.select("doc_id", v.alias("shash"))


def _flag_seen(incoming: DataFrame, index: DataFrame) -> DataFrame:
    """Stream-static (or batch) LEFT join against the gram index: one
    row per incoming (doc, gram) with a seen marker.  Both sides are
    gram-distinct, so downstream per-doc counts are DISTINCT counts."""
    idx = index.select(F.col("shash"), F.lit(True).alias("seen"))
    return incoming.join(idx, "shash", "left").select(
        "doc_id", "shash", F.coalesce("seen", F.lit(False)).alias("seen")
    )


def novelty_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode entry: per incoming doc (doc_id % INCOMING_MOD == 0),
    distinct-gram count, never-seen-gram count, and the novelty
    fraction vs the existing corpus."""
    shh = _hashed_shingles(spark, sf_dir)
    incoming = shh.filter(F.col("doc_id") % INCOMING_MOD == 0).select(
        "doc_id", "shash"
    )
    flagged = _flag_seen(incoming, corpus_gram_index(spark, sf_dir))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("seen"), F.lit(0)).otherwise(F.lit(1))
            ).alias("n_new"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_new") / F.col("n_grams"), 6)
        )
    )


NOVELTY_INCR_SQL = f"""
WITH {_SHINGLE_CTE},
{_SHINGLE_HASH_CTE},
idx AS (
  SELECT DISTINCT shash FROM shh WHERE doc_id % {INCOMING_MOD} <> 0
),
inc AS (
  SELECT doc_id, shash FROM shh WHERE doc_id % {INCOMING_MOD} = 0
),
tot AS (SELECT doc_id, count(*) AS n_grams FROM inc GROUP BY doc_id),
seen AS (
  SELECT i.doc_id, count(*) AS n_seen
  FROM inc i JOIN idx USING (shash) GROUP BY i.doc_id
)
SELECT t.doc_id,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(t.n_grams - coalesce(s.n_seen, 0) AS BIGINT) AS n_new,
       round((t.n_grams - coalesce(s.n_seen, 0)) * 1.0 / t.n_grams, 6)
         AS novelty
FROM tot t LEFT JOIN seen s USING (doc_id)
"""


def stream_novelty_against_index(
    spark: SparkSession, source_dir: str, index: DataFrame
) -> DataFrame:
    """Streaming incoming docs (parquet file source) flagged against
    the static corpus gram index.  Returns the streaming DataFrame of
    (doc_id, shash, seen) rows — stateless, append-mode; the consumer
    aggregates per doc (exact per micro-batch)."""
    docs = (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .option("path", source_dir)
        .load()
    )
    return _flag_seen(_incoming_gram_rows(docs), index)


QUERIES = {
    "novelty_incremental": novelty_incremental,
}

ORACLE = {
    "novelty_incremental": NOVELTY_INCR_SQL,
}
