"""Stream-stream joins (SURVEY.md §2 group F; generalizes the
reference's soul-routed update correlation, gun/gun.go:299-307, to
joins between two live update streams).

One definition serves batch and stream (the batch-equivalence tests run
the same function on static frames): watermarks apply only to streaming
inputs, and the join's explicit event-time bounds are what lets Spark
expire buffered state — without them a stream-stream join holds both
sides forever, which at 100 TB/day is an OOM, not a feature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esgopeta_spark.streaming.windows import with_watermark


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 day",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """left ⋈ right on key where right_ts in [left_ts - lookback, left_ts].

    Streaming: both sides watermarked; the two-sided time bound gives the
    state store an eviction horizon (right rows older than
    max(left event time) - lookback - delay are dropped).  Batch: the
    same plan minus watermarks.  The key equality keeps the join hash-
    partitioned — the time predicate is a residual filter, never a
    nested-loop driver.
    """
    l = with_watermark(left, left_ts, watermark_delay)
    r = with_watermark(right, right_ts, watermark_delay)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] <= l[left_ts])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, "inner").drop(r[key])


def purchase_click_attribution(events_purchases: DataFrame, events_clicks: DataFrame, lookback: str = "1 day") -> DataFrame:
    """Attribution: every (purchase, click-by-same-user-within-lookback)
    pair — the canonical stream-stream correlation query."""
    p = events_purchases.select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = events_clicks.select("user_id", F.col("ts").alias("c_ts"), F.col("value").alias("click_value"))
    out = interval_join(p, c, key="user_id", left_ts="p_ts", right_ts="c_ts", lookback=lookback)
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_micros("p_ts").alias("p_us"),
        F.unix_micros("c_ts").alias("c_us"),
        F.floor(F.col("click_value") * 1000000.0 + 0.5).cast("bigint").alias("click_value_micro"),
    )


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 day",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER variant of :func:`interval_join` — the attribution
    shape that also reports the NON-converted rows: a left row with no
    in-window right match emits once with nulls on the right side.  On
    a stream this is exactly the case that NEEDS the watermark: Spark
    can only know 'no match will ever come' once the right watermark
    passes the window's end, so the null row emits at watermark expiry
    (Structured Streaming's documented outer-join semantics); batch is
    the same plan minus the wait.  Same state-eviction bounds as the
    inner form — both event-time conditions are mandatory for outer
    stream-stream joins, not just advisable."""
    l = with_watermark(left, left_ts, watermark_delay)
    r = with_watermark(right, right_ts, watermark_delay)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] <= l[left_ts])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    return l.join(r, cond, "leftOuter").drop(r[key])


def purchase_click_attribution_outer(
    events_purchases: DataFrame,
    events_clicks: DataFrame,
    lookback: str = "1 day",
) -> DataFrame:
    """Attribution INCLUDING unattributed purchases: every purchase row
    appears — matched ones once per in-window click, unmatched ones
    once with attributed=0 and null click fields (the conversion-rate
    denominator an attribution pipeline actually reports)."""
    p = events_purchases.select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = events_clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    )
    out = interval_join_outer(
        p.withColumnRenamed("user_id", "user_id"), c.withColumnRenamed("c_user", "user_id"),
        key="user_id", left_ts="p_ts", right_ts="c_ts", lookback=lookback,
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_micros("p_ts").alias("p_us"),
        F.unix_micros("c_ts").alias("c_us"),
        F.when(
            F.col("click_value").isNotNull(),
            F.floor(F.col("click_value") * 1000000.0 + 0.5).cast("bigint"),
        ).alias("click_value_micro"),
        F.col("c_ts").isNotNull().cast("int").alias("attributed"),
    )
