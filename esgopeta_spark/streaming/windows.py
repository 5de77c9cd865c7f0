"""Windowed streaming aggregations (SURVEY.md §2 F2-F4) — thin,
watermark-correct wrappers over the stock operators so batch and stream
share one definition (the batch-equivalence tests run these same
functions on a static DataFrame)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; only applies to streaming frames (no-op on batch)."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(events: DataFrame, width: str = "1 hour", ts_col: str = "ts") -> DataFrame:
    e = with_watermark(events, ts_col)
    return (
        e.groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.unix_millis("w.start").alias("w_start_ms"), "event_type", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    e = with_watermark(events, ts_col)
    return (
        e.groupBy(F.window(ts_col, width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_millis("w.start").alias("w_start_ms"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    e = with_watermark(events, ts_col)
    return (
        e.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.unix_millis("w.start").alias("session_start_ms"), "n_events")
    )
