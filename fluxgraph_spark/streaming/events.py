"""Event-stream operators (training-data pipeline surface).

Everything here is built-in Structured Streaming — watermarks, window /
session_window aggregation, and dropDuplicatesWithinWatermark — so the
operators inherit Spark's state store, late-data semantics, and
exactly-once sinks.  No reference citation: the reference has no
streaming (SURVEY.md §2.8); this is the extended surface.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import timeutil

def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """``readStream`` over an events parquet directory (the testdata
    `events` table layout).

    Structured Streaming needs an explicit schema; take it from a batch
    footer read of the same path so the source tracks whatever timestamp
    flavor the producer writes (naive micros -> TIMESTAMP_NTZ today;
    TIMESTAMP(NANOS)-as-long historically).  ``ts`` is normalized to
    TIMESTAMP_NTZ wall clock either way."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    # Watermarks/event-time require TIMESTAMP (LTZ).  Convert wall clock
    # -> the epoch-equivalent UTC instant via epoch-micros arithmetic
    # (session-timezone-independent, unlike a bare NTZ->LTZ cast).
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        df = df.withColumn("ts", F.timestamp_micros(timeutil.ts_us("ts")))
    return df


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) per-type counts + value sums with a
    watermark bounding state.  Shuffles on (window, event_type) only."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    ).alias("win")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user sessions via the built-in ``session_window`` (gap-based,
    state bounded by the watermark) — the streaming twin of the batch
    sessionization in operators/temporal.py."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedupe(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Drop duplicate events within the watermark horizon (state is
    bounded — the unbounded-state ``dropDuplicates`` would OOM a
    long-running stream at scale)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each left row pairs with
    the right rows on the same keys whose timestamp falls in
    ``[left_ts - lookback, left_ts]`` (streaming click-attribution
    shape).  The time bound plus both watermarks lets Spark evict
    right-side state older than ``watermark + lookback`` — without the
    bound a stream-stream join buffers forever and OOMs at scale.

    ``left_ts`` / ``right_ts`` must be distinct names and the two
    schemas otherwise disjoint apart from ``key_cols`` (select/alias
    before calling); the right key columns are dropped from the output.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = [lw[k] == rw[k] for k in key_cols] + [
        rw[right_ts] <= lw[left_ts],
        rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback}"),
    ]
    joined = lw.join(rw, cond, "inner")
    for k in key_cols:
        joined = joined.drop(rw[k])
    return joined
