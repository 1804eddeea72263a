"""Continuous-aggregate (hypertable-style) rollup maintenance: keep a
materialized hourly rollup current by merging in each new batch of
events WITHOUT rescanning history — the maintenance loop behind every
"continuous aggregate" / "materialized rollup" feature, and the batch
dual of the watermarked streaming rollup in streaming/events.py.

The design constraint is mergeability: every maintained measure must be
an associative partial state.

- count / sum: trivially mergeable (kept exact; sums in decimal).
- distinct users: NOT mergeable as a number — maintained as an HLL
  sketch (Spark's datasketches `hll_sketch_agg` binary state) and
  merged with `hll_union_agg`. HLL register state is lossless under
  union (register-wise max), so maintain-then-estimate equals
  build-once-then-estimate exactly — the test pins that.

Scale shape: each maintenance cycle aggregates ONLY the delta (one
shuffle of the delta's (hour, event_type) partials), then merges into
the stored state with a groupBy over |state| + |delta-partials| rows —
history bytes are never re-read. State cardinality is bounded by
(hours x event_types), thousands of rows per year, so the merge is
dwarfed by the delta aggregation at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def hourly_rollup_state(events: DataFrame) -> DataFrame:
    """Aggregate raw events into mergeable hourly state."""
    return (
        events.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("value_sum"),
            F.hll_sketch_agg("user_id").alias("user_hll"),
        )
    )


def merge_rollup_state(state: DataFrame, delta_state: DataFrame) -> DataFrame:
    """Associative merge of two rollup states (stored ⊕ new batch)."""
    return (
        state.unionByName(delta_state)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("event_count").alias("event_count"),
            F.sum("value_sum").alias("value_sum"),
            F.hll_union_agg("user_hll").alias("user_hll"),
        )
    )


def present_rollup(state: DataFrame) -> DataFrame:
    """Read-side projection of the maintained state: exact counts/sums,
    HLL-estimated distinct users."""
    return state.select(
        "hour",
        "event_type",
        "event_count",
        F.round(F.col("value_sum"), 2).cast("double").alias("value_sum"),
        F.hll_sketch_estimate("user_hll").alias("unique_users_est"),
    )


def events_rollup_incremental(spark, sf_dir: str) -> DataFrame:
    """Oracle-gated maintenance proof: build the rollup by merging
    three out-of-order deltas and emit the EXACT measures — the DuckDB
    oracle recomputes from all events in one pass, so the hash match
    proves incremental maintenance loses nothing. (The HLL estimate
    column is excluded here: DuckDB's approx sketch differs; its
    equivalence is pinned register-exactly in
    tests/test_rollup_maintenance.py.)"""
    import os

    from stac_geoparquet_spark.operators.relational import read_events

    from stac_geoparquet_spark.operators._io import fenced

    events = read_events(spark, os.path.join(sf_dir, "events.parquet"))
    # pmod + coalesce: every row must land in exactly ONE delta —
    # Spark's % keeps the dividend's sign (negative ids would match no
    # branch) and NULL % 3 is NULL (a NULL-id row would silently drop
    # from the maintained state while the full-scan oracle counts it)
    bucket = F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(3))
    # r10: ONE events scan builds all three delta states (the three
    # `events.where(bucket == i)` branches each re-ran the scan + the
    # hourly aggregate — no CSE across Union branches; guide §2.4).
    # The per-(hour, type, bucket) rollup is calendar×alphabet-bounded
    # (≤ 3 rows per hour-type cell), so the fence contract holds.  The
    # HLL column is left out of the pre-aggregate: this declared query
    # drops the estimate anyway (column pruning removed the sketches
    # from the executed plan before; materializing them in the fence
    # would ADD work the query never reported) — the sketch path keeps
    # its register-exact equivalence pin in
    # tests/test_rollup_maintenance.py over the unchanged library
    # helpers above.  Exact measures are unaffected: per-cell counts
    # and DECIMAL sums merge associatively, so delta(i) equals
    # hourly_rollup_state(parts[i]) minus the pruned sketch column.
    per = fenced(
        events.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .withColumn("b", bucket)
        .groupBy("hour", "event_type", "b")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("value_sum"),
        )
    )

    def delta(i: int) -> DataFrame:
        return per.where(F.col("b") == i).select(
            "hour", "event_type", "event_count", "value_sum"
        )

    def merge(a: DataFrame, b: DataFrame) -> DataFrame:
        # merge_rollup_state minus the pruned sketch column
        return (
            a.unionByName(b)
            .groupBy("hour", "event_type")
            .agg(
                F.sum("event_count").alias("event_count"),
                F.sum("value_sum").alias("value_sum"),
            )
        )

    state = merge(delta(1), delta(0))
    state = merge(state, delta(2))
    return state.select(
        "hour",
        "event_type",
        "event_count",
        F.round(F.col("value_sum"), 2).cast("double").alias("value_sum"),
    )


EVENTS_ROLLUP_INCREMENTAL_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       count(*) AS event_count,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "events_rollup_incremental": events_rollup_incremental,
}

ORACLE = {
    "events_rollup_incremental": EVENTS_ROLLUP_INCREMENTAL_SQL,
}
