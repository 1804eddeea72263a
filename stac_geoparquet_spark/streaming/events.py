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


def session_window_rollup(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Built-in gap sessionization: ``F.session_window`` keyed by
    user — the declarative counterpart of ``sessionize_stream`` (which
    demonstrates the *custom* stateful path). Same session boundaries;
    state management is Spark's own session-window store, so prefer
    this form unless per-event custom state is genuinely needed.
    Works identically on batch and streaming inputs."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, value_sum double"
)
# session bounds as INTEGRAL microseconds: float seconds cannot
# represent microsecond event times exactly (1704067200.000001 has no
# double representation), so a float state would emit session bounds
# 1us off the batch sessionizer's and wobble gap comparisons
_SESSION_STATE_SCHEMA = (
    "start bigint, last bigint, n bigint, v double"
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization with
    ``applyInPandasWithState`` + event-time timeout.

    Semantics match the batch operator
    (operators.relational.events_sessionize) for in-order data: a
    user's events belong to one session while consecutive gaps are
    <= gap_minutes.  The OPEN session is emitted when the watermark
    passes its last event + gap (event-time timeout); a session closed
    by a larger in-batch gap is emitted immediately — final unless a
    late event inside the watermark would have bridged the gap (the
    standard state-store approximation; exactness there would require
    buffering all events until the watermark).  Late events that the
    watermark admits extend the stored session bounds monotonically
    (min start / max end) — they never regress them.  State per user is
    four scalars (start, last, count, sum) — bounded, skew-safe (keyed
    by user_id), and the state store scales horizontally with shuffle
    partitions.

    The reference has nothing stateful (SURVEY.md §2.7); this is the
    beyond-reference streaming surface of the engine.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            start, last, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "value_sum": [round(v, 2)],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        # exact integral microseconds, never float seconds
        ts = rows["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        out = []
        if state.exists:
            start, last, n, v = state.get
        else:
            start = None
        for t, val in zip(ts, rows["value"]):
            if start is None:
                start, last, n, v = t, t, 0, 0.0
            elif t - last > gap_us:
                out.append((key[0], start, last, n, v))
                start, last, n, v = t, t, 0, 0.0
            n += 1
            v += float(val)
            # Late events admitted by the watermark may precede the
            # stored bounds: extend, never regress (last = t would
            # shrink session_end and pull the event-time timeout
            # backwards; start is likewise min-adjusted).
            if t < start:
                start = t
            if t > last:
                last = t
        state.update((int(start), int(last), n, v))
        # wake up when the watermark passes last + gap (ms resolution)
        state.setTimeoutTimestamp(int((last + gap_us) // 1000) + 1)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [
                        pd.Timestamp(o[1], unit="us") for o in out
                    ],
                    "session_end": [
                        pd.Timestamp(o[2], unit="us") for o in out
                    ],
                    "n_events": [o[3] for o in out],
                    "value_sum": [round(o[4], 2) for o in out],
                }
            )

    # same contract as the batch sessionizer: sessionization is
    # undefined without a timestamp or user key (a NULL ts would reach
    # the state function as NaT and poison the gap arithmetic)
    events = events.where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_events_sessions(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_table: str = "events_sessions_stream",
    gap_minutes: int = 30,
    max_files_per_trigger: int | None = 1,
) -> None:
    """Drain available files through the stateful sessionizer into an
    in-memory table. maxFilesPerTrigger=1 advances the watermark
    between micro-batches so closed sessions flush incrementally."""
    events = read_event_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    sessions = sessionize_stream(events, gap_minutes=gap_minutes)
    q = (
        sessions.writeStream.outputMode("append")
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
