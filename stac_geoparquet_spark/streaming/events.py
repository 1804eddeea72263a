"""Structured Streaming surface.

The reference has no record-level streaming; its closest construct is
change-data-driven incremental sync (sync_pgstac_to_parquet,
pgstac_reader.py:340-383 — re-export changed partitions). This module
provides the two Spark idioms that subsume it:

- ``stream_events_to_sink``: file-source streaming with
  Trigger.AvailableNow — process everything currently available, then
  stop. This is exactly the incremental-sync execution model: each
  invocation drains the new data, checkpoint state makes it
  exactly-once.
- ``stream_events_hourly``: watermarked tumbling-window aggregation —
  the late-data-tolerant rollup a 100-TB event pipeline needs.

At scale: the file source lists incrementally (maxFilesPerTrigger
bounds batch size); the windowed agg state is keyed by (window,
event_type) — bounded cardinality, safe state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream with an explicit schema (streaming
    sources must not infer)."""
    reader = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("path", source_dir)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load()


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup. Works on both batch and
    streaming DataFrames (same code path — the batch run in
    operators.relational.events_hourly_rollup is its oracle)."""
    # Watermarks require TIMESTAMP (with zone); source parquet carries
    # tz-naive timestamp[ns] -> NTZ. Session tz is pinned to UTC, so the
    # cast is a stable UTC interpretation.
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    with_wm = events.withWatermark("ts", watermark)
    return (
        with_wm.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


def stream_events_hourly(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_table: str = "events_hourly_stream",
) -> None:
    """Run the watermarked hourly rollup over all currently-available
    files (Trigger.AvailableNow), writing to an in-memory table.
    Returns after the stream drains."""
    events = read_event_stream(spark, source_dir)
    agg = hourly_rollup(events)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(output_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_events_to_sink(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    transform=None,
) -> None:
    """Incremental sync: drain available input files into a parquet
    sink exactly once per invocation (the Spark analogue of
    sync_pgstac_to_parquet's changed-partition re-export). Re-running
    with the same checkpoint processes only new files."""
    events = read_event_stream(spark, source_dir)
    if transform is not None:
        events = transform(events)
    q = (
        events.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
