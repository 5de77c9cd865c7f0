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


def windowed_cms_state(
    events: DataFrame,
    width: str = "1 hour",
    key_col: str = "user_id",
    depth: int = 4,
    n_buckets: int = 256,
    ts_col: str = "ts",
) -> DataFrame:
    """Count-Min sketch state PER EVENT-TIME WINDOW — the streaming
    heavy-hitters shape: each window accumulates a depth x n_buckets
    int64 counter grid (operators/sketches.cms_bucket — same Lehmer hash
    family, so the state is exchangeable with the batch sketch); point
    queries and thresholding run downstream over the tiny grid rows.

    Streaming-safe by construction: the per-row bucket projection is
    stateless, and the only stateful operator is the windowed count
    aggregate — watermark-bounded, partial-aggregated map-side, at most
    depth * n_buckets rows of state per window.  Batch ≡ stream over the
    same function is pinned in tests/test_streaming.py.
    """
    from esgopeta_spark.operators.sketches import cms_bucket

    e = with_watermark(events, ts_col)
    # one pass with an exploded depth column (the batch cms_state shape)
    # instead of a union of per-row selects — on a stream the union also
    # multiplied the source
    grid = e.select(
        F.window(ts_col, width).alias("w"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("cms_row"),
        F.col(key_col).alias("_k"),
    ).select(
        "w",
        "cms_row",
        cms_bucket(F.col("_k"), F.col("cms_row"), n_buckets).alias("cms_bucket"),
    )
    return (
        grid.groupBy("w", "cms_row", "cms_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(F.unix_millis("w.start").alias("w_start_ms"), "cms_row", "cms_bucket", "cnt")
    )
