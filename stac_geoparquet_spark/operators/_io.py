"""Shared input helpers for the operator modules."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_spread(
    spark: SparkSession, path: str, target: int | None = None
) -> DataFrame:
    """Read parquet, spreading the input across the cluster ONLY when
    the scan yields fewer splits than ``target`` (default: one per
    core — the single-small-file test fixture case, where one task
    would otherwise do all the per-row expression work).

    At scale this must be a no-op: a 100 TB table already scans as
    thousands of splits, and an unconditional ``repartition`` there is
    either a pointless full-table shuffle (repartition up) or a
    catastrophic parallelism collapse (repartition down to a small
    constant).  The partition count check is plan-time metadata (file
    listing), not a job.
    """
    df = spark.read.parquet(path)
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_spread(spark, os.path.join(sf_dir, "documents.parquet"))
