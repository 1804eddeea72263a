"""The two-phase grouped top-K scaffold — ONE definition for every
operator that needs per-group order statistics without a window
partitioned by the (bounded-cardinality) group key.

Phase 1 (``local_topk``): each shuffle partition keeps its own top-K
per group via a window over (group, spark_partition_id).  Partition
count scales with the cluster, and any global top-K member is
necessarily in the top-K of whatever partition it landed in, so the
union of local winners always contains the true answer — for ANY
partition assignment, which is why the non-deterministic
spark_partition_id is safe here (no cross-branch consistency needed;
contrast pipeline.select_token_budget's prefix sum, where partition
ids must agree across branches and a reused range exchange provides
that).

Phase 2 (``kth_smallest`` / ``merge_bottomk``): the bounded P*K
candidate set per group merges in-row (array_sort over a collect_list
that can never exceed P*K elements — cluster-bounded, not
data-bounded).  ``kth_smallest`` yields the k-th order statistic (NULL
when the group holds fewer than k candidates — the WHEN guard, not a
bare element_at, keeps that contract ANSI-safe); ``merge_bottomk``
yields the full bottom-K set as rows.

Used by: operators/pipeline.cap_docs_per_source,
streaming/quota.source_quota_incremental,
operators/stats.kmv_source_overlap, operators/stats.sketch_kmv_distinct
(all oracle-gated, so any change here is re-proven against DuckDB at
every gate run).  The registry sweep in tests/test_registry_contract.py
rejects the single-phase alternative (a window partitioned only by the
bounded group key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def local_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
) -> DataFrame:
    """Phase 1: per (group, shuffle partition) local top-K under
    ``order_cols``; output drops the scaffolding columns and is the
    bounded candidate set for a phase-2 merge."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols, "pid").orderBy(*order_cols)
    return (
        df.withColumn("pid", F.spark_partition_id())
        .withColumn("lrk", F.row_number().over(w))
        .where(F.col("lrk") <= k)
        .drop("pid", "lrk")
    )


def kth_smallest(
    candidates: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    out_col: str,
) -> DataFrame:
    """Phase 2: per group, the k-th smallest ``value_col`` among the
    candidates — NULL when the group holds fewer than k (the under-K
    contract every threshold consumer relies on)."""
    mins = F.slice(F.array_sort(F.collect_list(value_col)), 1, k)
    return (
        candidates.groupBy(*group_cols)
        .agg(mins.alias("_mins"))
        .select(
            *group_cols,
            F.when(
                F.size("_mins") >= k, F.element_at("_mins", k)
            ).alias(out_col),
        )
    )


def merge_bottomk(
    candidates: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
) -> DataFrame:
    """Phase 2 (set form): per group, the k smallest ``value_col``
    values as rows — the merged mergeable-sketch state."""
    return (
        candidates.groupBy(*group_cols)
        .agg(
            F.slice(F.array_sort(F.collect_list(value_col)), 1, k).alias(
                "_mins"
            )
        )
        .select(*group_cols, F.explode("_mins").alias(value_col))
    )
