"""Similarity search over the ``embeddings`` table.

- ``knn_brute_force``: exact cosine top-k for a fixed query set — the
  correctness baseline. The dot product is computed with zip_with +
  sequential aggregate over the array (deterministic IEEE order, so the
  DuckDB oracle is bit-identical).
- ``ann_lsh_bucketed``: the scale path — random-hyperplane LSH. Sign
  bits of hyperplane dot products form a bucket key; only same-bucket
  candidates are scored. Hyperplanes are derived from md5 so Spark and
  the oracle share them exactly (embedded as literals on both sides).

Scale notes (100 TB): brute force is O(Q x N) — fine for small Q as a
broadcast-join of the query set against a partitioned scan, unusable
for all-pairs. LSH reduces candidate generation to an equi-join on
bucket key (shuffle on high-entropy key, AQE-skew-safe); recall tunes
with planes/bands. IVF (k-means coarse quantizer) is the other
standard path; LSH was chosen because it is stateless and oracle-able.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
N_PLANES = 12
N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 10


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]: component
    (p, d) = md5("p:d") first 8 hex as u32, scaled. Reproducible in any
    engine with md5."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8]
            row.append(int(h, 16) / 0xFFFFFFFF * 2.0 - 1.0)
        planes.append(row)
    return planes


def _as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential (deterministic-order) double dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


# --------------------------------------------------------------------------
# exact brute-force top-k
# --------------------------------------------------------------------------
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    emb = emb.withColumn("norm", _norm(F.col("v")))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        F.broadcast(q)
        .join(emb, F.col("query_id") != F.col("vec_id"))
        .withColumn("cos_sim", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


_DOT_SQL = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"

KNN_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt({_DOT_SQL.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS norm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT_SQL.format(a='q.v', b='c.v')} / (q.norm * c.norm), 6) AS cos_sim
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# LSH-bucketed ANN
# --------------------------------------------------------------------------
def _bucket_expr(v: Column, planes: list[list[float]]) -> Column:
    """Bucket id = sum over planes of (dot(plane, v) >= 0) << p."""
    bucket = None
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(plane_col, v) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("bigint")


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    planes = _hyperplanes()
    emb = _emb(spark, sf_dir).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    emb = emb.withColumn("norm", _norm(F.col("v"))).withColumn(
        "bucket", _bucket_expr(F.col("v"), planes)
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        F.broadcast(q)
        .join(
            emb,
            (F.col("qbucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .withColumn("cos_sim", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_sim", "rank")
    )


def _ann_oracle_sql() -> str:
    planes = _hyperplanes()
    bits = " + ".join(
        f"(CASE WHEN {_DOT_SQL.format(a='[' + ', '.join(repr(x) for x in plane) + ']', b='v')} >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt({_DOT_SQL.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS norm
  FROM embeddings
),
bucketed AS (
  SELECT vec_id, v, norm, CAST({bits} AS BIGINT) AS bucket FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT_SQL.format(a='q.v', b='c.v')} / (q.norm * c.norm), 6) AS cos_sim
  FROM bucketed q
  JOIN bucketed c
    ON q.vec_id < {N_QUERIES} AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES = {
    "knn_brute_force": knn_brute_force,
    "ann_lsh_bucketed": ann_lsh_bucketed,
}

ORACLE = {
    "knn_brute_force": KNN_SQL,
    "ann_lsh_bucketed": _ann_oracle_sql(),
}
