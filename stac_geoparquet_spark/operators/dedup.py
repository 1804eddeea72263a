"""Deduplication operators over the ``documents`` / ``embeddings``
tables — the training-data-pipeline surface a 100-TB corpus engine
needs (exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine).

Determinism/portability: every hash is derived from md5 (identical in
Spark and DuckDB), so each operator has an exact SQL oracle. Spark-side
implementations are pure DataFrame expressions (no Python UDFs in any
hot path).

Scale notes (100 TB):
- Exact dedup: single shuffle on the content hash; map-side partial
  aggregation applies.
- N-gram Jaccard: the shared-shingle self-join is quadratic in bucket
  size — it is the *verifier*; MinHash banding is the candidate
  generator at scale (dedup_minhash_lsh does band-join first, then
  verifies only candidates).
- Shingle explosion is linear; hot shingles (stop-phrase buckets) are
  the skew risk — AQE skew-join splitting is enabled in the session
  factory, and the band join keys (band_id, band_key) are high-entropy
  by construction.
- SimHash: one pass, 32 partial aggregates per doc, no join at all —
  the cheapest near-dup signal at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SHINGLE_K = 3  # words per shingle
NUM_HASHES = 32  # minhash signature length
NUM_BANDS = 8  # 8 bands x 4 rows
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32
COSINE_THRESHOLD = 0.45


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    # The source is a single small parquet file => one input split. The
    # per-row work downstream (shingling, hashing) is the expensive part,
    # so spread rows across the cluster first; at real scale the input
    # has thousands of splits and this repartition collapses into a no-op
    # choice (AQE coalesces tiny shuffles).
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(spark.sparkContext.defaultParallelism)
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .repartition(spark.sparkContext.defaultParallelism)
    )


# --------------------------------------------------------------------------
# shared text primitives (Spark side; the oracle mirrors each in DuckDB)
# --------------------------------------------------------------------------
def _words(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def _shingles_from_words(w: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles from a *materialized* words column.

    The words array must be a real column (projection boundary), not an
    inline split expression: Catalyst does not CSE inside higher-order
    lambdas, so an inline split would re-tokenize the document once per
    shingle index (~7x slower end to end).
    """
    gen = F.transform(
        F.sequence(F.lit(0), F.size(w) - F.lit(k)),
        lambda i: F.concat_ws(" ", F.slice(w, i + F.lit(1), k)),
    )
    return F.array_distinct(
        F.when(F.size(w) >= k, gen).otherwise(F.array().cast("array<string>"))
    )


def _hash32(col: Column, seed: int) -> Column:
    """Portable 32-bit unsigned hash as bigint: first 8 hex chars of
    md5(seed ':' value). DuckDB: ('0x'||substr(md5(...),1,8))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10
    ).cast("bigint")


_MINHASH_PRIME = 4294967291  # largest prime < 2^32


def _hash_pair(col: Column) -> tuple[Column, Column]:
    """Two independent 32-bit hashes from ONE md5 (hex chars 1-8 and
    9-16). The minhash family is h_i = (h1 + i*h2) mod p — one md5 per
    row instead of NUM_HASHES of them."""
    h = F.md5(col)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    return h1, h2


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("doc_id", _words(F.col("text")).alias("w"))
        .select("doc_id", F.explode(_shingles_from_words(F.col("w"))).alias("shingle"))
    )


def _shingle_hash_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, 60-bit shingle hash) — joins on a bigint instead of the
    shingle string: smaller shuffle, faster equi-join. Collisions
    (~2^-60 per pair) are mirrored exactly by the oracle."""
    return _shingle_rows(spark, sf_dir).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("shash"),
    )


_SHINGLE_CTE = f"""
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - {SHINGLE_K - 1}),
           i -> array_to_string(
                  (regexp_split_to_array(lower(trim(text)), '\\s+'))[i+1:i+{SHINGLE_K}],
                  ' ')
         )) AS shingle
  FROM documents
)
"""


# --------------------------------------------------------------------------
# 1. exact dedup — hash-groupBy
# --------------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    h = F.md5(F.col("text")).alias("content_hash")
    w = Window.partitionBy("content_hash")
    return (
        docs.select("doc_id", h)
        .withColumn("keep", F.col("doc_id") == F.min("doc_id").over(w))
    )


DEDUP_EXACT_SQL = """
SELECT doc_id,
       md5(text) AS content_hash,
       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep
FROM documents
"""


# --------------------------------------------------------------------------
# 2. n-gram Jaccard near-dup pairs (exact, quadratic verifier)
# --------------------------------------------------------------------------
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shingle set feeds three plan branches (two join sides +
    # sizes); cache it once instead of re-shingling three times
    sh = _shingle_hash_rows(spark, sf_dir).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shash") == F.col("b.shash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sa.n") + F.col("sb.n") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


_SHINGLE_HASH_CTE = """
shh AS (
  SELECT doc_id, ('0x'||substr(md5(shingle),1,15))::BIGINT AS shash FROM sh
)
"""

DEDUP_NGRAM_SQL = f"""
WITH {_SHINGLE_CTE},
{_SHINGLE_HASH_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shh a JOIN shh b ON a.shash = b.shash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# 3. MinHash + LSH banding (the scale path: candidates from band
#    collisions, exact Jaccard verified only on candidates)
# --------------------------------------------------------------------------
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_rows(spark, sf_dir).cache()
    h1, h2 = _hash_pair(F.col("shingle"))
    hashed = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.col("h1") + F.lit(s) * F.col("h2")) % _MINHASH_PRIME).alias(
                f"h{s}"
            )
            for s in range(NUM_HASHES)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                "-",
                *[
                    F.col(f"h{b * ROWS_PER_BAND + r}")
                    for r in range(ROWS_PER_BAND)
                ],
            ).alias("band_key"),
        )
        for b in range(NUM_BANDS)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")

    x = bands.alias("x")
    y = bands.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # derive the verify-side hashed shingles from the cached sh
    shh = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("shash"),
    ).cache()
    sizes = shh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shh.alias("a")
    b = shh.alias("b")
    inter = (
        cands.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(
            b,
            (F.col("doc_b") == F.col("b.doc_id"))
            & (F.col("a.shash") == F.col("b.shash")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sa.n") + F.col("sb.n") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_oracle_sql() -> str:
    min_exprs = ",\n         ".join(
        f"min((h1 + {s} * h2) % {_MINHASH_PRIME}) AS h{s}"
        for s in range(NUM_HASHES)
    )
    band_rows = ", ".join(
        "("
        + str(b)
        + ", concat_ws('-', "
        + ", ".join(f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        + "))"
        for b in range(NUM_BANDS)
    )
    return f"""
WITH {_SHINGLE_CTE},
hashed AS (
  SELECT doc_id,
         ('0x'||substr(md5(shingle),1,8))::BIGINT AS h1,
         ('0x'||substr(md5(shingle),9,8))::BIGINT AS h2
  FROM sh
),
sig AS (
  SELECT doc_id,
         {min_exprs}
  FROM hashed GROUP BY doc_id
),
bands AS (
  SELECT doc_id, t.band_id, t.band_key
  FROM sig, LATERAL (VALUES {band_rows}) AS t(band_id, band_key)
),
cands AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
),
{_SHINGLE_HASH_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
inter AS (
  SELECT doc_a, doc_b, count(*) AS i
  FROM cands
  JOIN shh a ON a.doc_id = doc_a
  JOIN shh b ON b.doc_id = doc_b AND b.shash = a.shash
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# 4. SimHash fingerprint (one-pass, join-free near-dup signal)
# --------------------------------------------------------------------------
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    wdf = docs.select(
        "doc_id", F.explode(F.array_distinct(_words(F.col("text")))).alias("w")
    ).withColumn("h", _hash32(F.col("w"), 0))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(
                -1
            )
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = wdf.groupBy("doc_id").agg(*bit_sums)
    simhash = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return agg.select("doc_id", simhash.cast("bigint").alias("simhash"))


def _simhash_oracle_sql() -> str:
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    terms = " + ".join(
        f"(CASE WHEN s{j} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH wd AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
  FROM documents
),
hashed AS (
  SELECT doc_id, ('0x'||substr(md5('0:'||w),1,8))::BIGINT AS h FROM wd
),
agg AS (
  SELECT doc_id,
         {bit_sums}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM agg
"""


# --------------------------------------------------------------------------
# 5. embedding-cosine near-dup pairs (brute-force verifier; LSH variant
#    lives in operators/similarity.py)
# --------------------------------------------------------------------------
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= threshold via blocked matrix product.

    A pairwise Catalyst join evaluating a 64-element fold per pair is
    interpreted (higher-order functions don't codegen) and ~25s at
    sf0.1; the same math as one numpy GEMM per partition block against
    a broadcast of the (small) normalized matrix is two orders faster
    and the idiomatic 100-TB shape: block the big side, broadcast the
    small side. Emitted similarities are rounded to 6 decimals, which
    absorbs BLAS-vs-sequential summation-order noise relative to the
    oracle (~1e-15 vs the 5e-7 rounding quantum).
    """
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    # Broadcast the full normalized matrix (N x 64 doubles — 5 MB at
    # 10k vectors; at true scale this becomes the IVF/LSH-bucketed
    # variant, see ann_lsh_bucketed).
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    unit = mat / norms[:, None]
    sc = spark.sparkContext
    b_ids = sc.broadcast(ids)
    b_unit = sc.broadcast(unit)

    out_schema = "vec_a bigint, vec_b bigint, cos_sim double"

    def block(batches):
        for pdf_block in batches:
            a_ids = pdf_block["vec_id"].to_numpy()
            a = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf_block["embedding"]]
            )
            a_unit = a / np.sqrt((a * a).sum(axis=1))[:, None]
            sims = a_unit @ b_unit.value.T
            rows_i, cols_j = np.nonzero(
                (np.round(sims, 6) >= COSINE_THRESHOLD)
                & (a_ids[:, None] < b_ids.value[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[rows_i],
                    "vec_b": b_ids.value[cols_j],
                    "cos_sim": np.round(sims[rows_i, cols_j], 6),
                }
            )

    return emb.mapInPandas(block, schema=out_schema)


DEDUP_EMBEDDING_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS norm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
             / (a.norm * b.norm), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
            / (a.norm * b.norm), 6) >= {COSINE_THRESHOLD}
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
}

ORACLE = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_minhash_lsh": _minhash_oracle_sql(),
    "dedup_simhash": _simhash_oracle_sql(),
    "dedup_embedding_cosine": DEDUP_EMBEDDING_SQL,
}
