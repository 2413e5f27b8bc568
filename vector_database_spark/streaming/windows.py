"""Streaming window analytics over an event stream.

Streaming twins of the batch queries in `workload` (e01/e02/e03):
tumbling-window aggregation with watermarks for late data, session
windows, and keep-latest dedup. Each takes a *streaming* DataFrame
(`spark.readStream...`) and returns the transformed streaming frame;
callers attach the sink. All are also valid on batch frames — Spark's
unified semantics — which is how the oracle checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window per-key count/sum with a watermark bounding state."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n",
        "sum_value",
    )


def session_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session-window aggregation (gap-based), the streaming-native
    form of the batch lag+cumsum sessionization."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
    ).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        key_col,
        "n_events",
        "first_event",
    )


def latest_per_key(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming keep-latest via max_by aggregation (update mode)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max_by("event_id", F.col(ts_col)).alias("event_id"),
        F.max(ts_col).alias("last_ts"),
    )
