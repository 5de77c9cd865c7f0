"""Time-series resampling: regular-grid bucketing with
last-observation-carried-forward (LOCF) gap fill — the hypertable
``time_bucket_gapfill + locf`` staple of time-series engines, expressed
as a pure DataFrame plan.

Shape: one (key, bucket) partial-agg pass picks each bucket's closing
value under a TOTAL order (last event by (ts, tiebreak)); per-key bucket
grids come from ``sequence()`` + ``explode`` over the key's own
[min, max] span (grid size == output size — nothing materializes beyond
the result); the fill is one ``last(ignorenulls)`` running window per
key.  All joins equi on (key, bucket); the only shuffles are the bucket
agg and the per-key window sort.  At 100 TB: the grid explode is
output-bound, the window partitions by series key (time-series
cardinality, not event cardinality), and a hot series salts like any
hot window key.

Determinism: the closing value is picked by (ts, tiebreak) — a total
order when the tiebreak column is unique — and doubles are only CARRIED
(never summed), so the result is engine-exact (catalog rule 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_locf(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    unit: str = "day",
) -> DataFrame:
    """Per-key regular grid at ``unit`` granularity over the key's own
    observed span, each bucket carrying the last observed value at or
    before it.

    Returns (key, bucket [date], filled_value, n_events, is_gap):
    ``n_events`` = observations inside the bucket (0 for gaps),
    ``is_gap`` = 1 where the bucket had no observation and the value is
    carried forward.  The first bucket of a key is always observed (the
    grid starts at the key's first event), so ``filled_value`` is never
    null.
    """
    if unit != "day":  # the oracle-checked granularity; others share the plan
        raise ValueError(f"unsupported unit: {unit!r}")
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    obs = (
        df.select(
            F.col(key_col).alias("_k"),
            day.alias("bucket"),
            F.col(value_col).alias("_v"),
            F.col(ts_col).alias("_ts"),
            F.col(tiebreak_col).alias("_tb"),
        )
        .groupBy("_k", "bucket")
        .agg(
            F.max_by("_v", F.struct(F.col("_ts"), F.col("_tb"))).alias("_day_value"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    bounds = obs.groupBy("_k").agg(
        F.min("bucket").alias("_d0"), F.max("bucket").alias("_d1")
    )
    grid = bounds.select(
        "_k",
        F.explode(F.expr("sequence(_d0, _d1, interval 1 day)")).alias("bucket"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["_k", "bucket"], "left")
        .select(
            F.col("_k").alias(key_col),
            "bucket",
            F.last("_day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.when(F.col("n_events").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("is_gap"),
        )
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    z_threshold_micro: int = 2_000_000,
) -> DataFrame:
    """Rolling z-score anomaly detection over per-key DAILY totals — the
    time-series-monitoring staple (spike/drop detection on a trailing
    baseline).

    Per key and day: total = exact cent sum of ``value_col`` (rule 1 —
    never a float sum); baseline = the TRAILING ``window_days`` rows
    (ROWS frame, current day included); z = (x - mean) / sd with
    mean/sd derived from exact integer cent sums in an IDENTICAL IEEE
    op sequence on both engines (rule 2), emitted as integer
    micro-units (rule 3).  Days with fewer than 4 baseline rows or zero
    variance report NULL z (cold start / constant series are not
    anomalies).

    Output: (key, day, total_cents, n_base, z_micro, is_anomaly).
    Plan: one partial-agg shuffle to daily totals (day cardinality, not
    event cardinality), then one per-key window sort — the window
    partitions by series key, so a hot key salts like any hot window
    key at 100 TB.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (
        # null/NaN values carry no signal: drop them up front so an
        # all-null day vanishes instead of emitting a NULL-total row —
        # and so the streaming twin (which must skip them row-by-row)
        # converges to the identical series
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)))
        .select(F.col(key_col).alias("_k"), day.alias("day"),
                F.col(value_col).cast("decimal(12,2)").alias("_v"))
        .groupBy("_k", "day")
        .agg((F.sum("_v") * 100).cast("bigint").alias("total_cents"))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("day").asc())
        .rowsBetween(-(window_days - 1), Window.currentRow)
    )
    stats = daily.select(
        "_k", "day", "total_cents",
        F.count(F.lit(1)).over(w).alias("n_base"),
        F.sum("total_cents").over(w).alias("_s1"),
        F.sum(F.col("total_cents") * F.col("total_cents")).over(w).alias("_s2"),
    )
    # mean/sd in doubles derived from the exact integer sums; the textual
    # op order below is mirrored verbatim in the oracle SQL
    mean = F.col("_s1").cast("double") / F.col("n_base").cast("double")
    var = F.col("_s2").cast("double") / F.col("n_base").cast("double") - mean * mean
    sd = F.sqrt(var)
    z = (F.col("total_cents").cast("double") - mean) / sd
    z_micro = F.when(
        (F.col("n_base") >= 4) & (var > 0),
        F.floor(z * F.lit(1000000.0) + F.lit(0.5)).cast("bigint"),
    )
    return stats.select(
        F.col("_k").alias(key_col), "day", "total_cents",
        F.col("n_base").cast("bigint").alias("n_base"),
        z_micro.alias("z_micro"),
        F.when(z_micro.isNotNull() & (F.abs(z_micro) >= F.lit(int(z_threshold_micro))), 1)
        .otherwise(0).cast("int").alias("is_anomaly"),
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_milli: int = 300,
) -> DataFrame:
    """Exponentially-weighted moving average over per-key DAILY totals —
    the trend-smoothing staple next to :func:`rolling_zscore`'s spike
    detector — in EXACT integer arithmetic:

        s_1 = x_1
        s_t = (alpha·x_t + (1000 − alpha)·s_{t−1}) floordiv 1000

    The recursion has no closed window form, so the Spark side runs it
    as ONE Arrow ``mapInPandas`` pass over key-sorted partitions of the
    daily totals (per-group applyInPandas measured ~4 ms of pandas
    overhead per series — 6 s of a 7 s sf0.1 wall) and the oracle runs the identical recurrence as a DuckDB RECURSIVE
    CTE.  Division semantics (r9-measured): Python ``//`` FLOORS;
    Spark ``div`` and DuckDB ``//`` both truncate toward zero — so for
    the possibly-negative numerators here the oracle floors explicitly
    via ``(n - ((n % 1000 + 1000) % 1000)) // 1000`` (exact: the
    adjusted numerator is divisible, so truncation equals floor).

    Output: (key, day, total_cents, ewma_cents, dev_cents = x − s).

    Scale shape: one partial-agg shuffle to daily totals (day
    cardinality), then one repartition-by-key + in-partition sort and a
    single Arrow pass; a hot key costs one task of O(its days), same as
    any per-key window."""
    import pandas as pd

    alpha = int(alpha_milli)
    beta = 1000 - alpha
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)))
        .select(
            F.col(key_col).cast("bigint").alias("_k"),
            day.alias("day"),
            F.col(value_col).cast("decimal(12,2)").alias("_v"),
        )
        .groupBy("_k", "day")
        .agg((F.sum("_v") * 100).cast("bigint").alias("total_cents"))
    )

    # One mapInPandas over key-sorted partitions instead of per-group
    # applyInPandas: 1500 groups cost ~4 ms of pandas overhead EACH
    # (measured 6 s of the 7 s sf0.1 wall), while one pass over the
    # same rows is ~0.1 s.  repartition(key) puts every key in one
    # partition; sortWithinPartitions makes its days contiguous and
    # ordered; the kernel carries (key, s) across Arrow batch
    # boundaries, so a key straddling two batches continues exactly.
    part = daily.repartition("_k").sortWithinPartitions("_k", "day")

    def kernel(batches):
        cur, s = None, None
        for pdf in batches:
            ks, days, xs, ss = [], [], [], []
            for k, d, x in zip(pdf["_k"], pdf["day"], pdf["total_cents"]):
                k, x = int(k), int(x)
                if k != cur:
                    cur, s = k, None
                s = x if s is None else (alpha * x + beta * s) // 1000
                ks.append(k)
                days.append(d)
                xs.append(x)
                ss.append(s)
            if ks:
                yield pd.DataFrame(
                    {
                        key_col: pd.Series(ks, dtype="int64"),
                        "day": days,
                        "total_cents": pd.Series(xs, dtype="int64"),
                        "ewma_cents": pd.Series(ss, dtype="int64"),
                        "dev_cents": pd.Series(
                            [x - s for x, s in zip(xs, ss)], dtype="int64"
                        ),
                    }
                )

    return part.mapInPandas(
        kernel,
        f"{key_col} bigint, day date, total_cents bigint, "
        "ewma_cents bigint, dev_cents bigint",
    )


def holt_trend(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_milli: int = 300,
    beta_milli: int = 100,
) -> DataFrame:
    """Holt's double-exponential smoothing (level + trend) over per-key
    DAILY totals — the one-step-ahead forecasting staple above
    :func:`ewma_smooth` — in EXACT integer arithmetic:

        l_1 = x_1,  b_1 = 0
        l_t = (α·x_t + (1000−α)·(l_{t−1} + b_{t−1})) floordiv 1000
        b_t = (β·(l_t − l_{t−1}) + (1000−β)·b_{t−1}) floordiv 1000

    forecast_next = l_t + b_t (the value the model predicts for the
    NEXT day — join it against the realized next day for residual
    monitoring).  Same engine-exactness argument as ewma_smooth: the
    coupled recursion runs as one key-sorted Arrow ``mapInPandas`` pass
    on the Spark side and as the identical RECURSIVE CTE in the oracle —
    with the oracle's divisions floored via the non-negative-mod idiom,
    because level deltas and trends go negative routinely and DuckDB's
    integer ``//`` truncates there while Python ``//`` floors (this
    entry is what exposed the divergence; see ewma_smooth).

    Output: (key, day, total_cents, level_cents, trend_cents,
    forecast_next_cents).

    Scale shape: one daily partial-agg shuffle + one key-sorted Arrow
    pass — identical to ewma_smooth."""
    import pandas as pd

    a = int(alpha_milli)
    b_ = int(beta_milli)
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)))
        .select(
            F.col(key_col).cast("bigint").alias("_k"),
            day.alias("day"),
            F.col(value_col).cast("decimal(12,2)").alias("_v"),
        )
        .groupBy("_k", "day")
        .agg((F.sum("_v") * 100).cast("bigint").alias("total_cents"))
    )

    # Same single-pass shape as ewma_smooth (see the measured rationale
    # there): one mapInPandas over key-sorted partitions, per-key state
    # carried across Arrow batch boundaries.
    part = daily.repartition("_k").sortWithinPartitions("_k", "day")

    def kernel(batches):
        cur, lev, tr = None, None, 0
        for pdf in batches:
            ks, days, xs, levs, trs = [], [], [], [], []
            for k, d, x in zip(pdf["_k"], pdf["day"], pdf["total_cents"]):
                k, x = int(k), int(x)
                if k != cur:
                    cur, lev, tr = k, None, 0
                if lev is None:
                    lev, tr = x, 0
                else:
                    prev = lev
                    lev = (a * x + (1000 - a) * (lev + tr)) // 1000
                    tr = (b_ * (lev - prev) + (1000 - b_) * tr) // 1000
                ks.append(k)
                days.append(d)
                xs.append(x)
                levs.append(lev)
                trs.append(tr)
            if ks:
                yield pd.DataFrame(
                    {
                        key_col: pd.Series(ks, dtype="int64"),
                        "day": days,
                        "total_cents": pd.Series(xs, dtype="int64"),
                        "level_cents": pd.Series(levs, dtype="int64"),
                        "trend_cents": pd.Series(trs, dtype="int64"),
                        "forecast_next_cents": pd.Series(
                            [lv + t for lv, t in zip(levs, trs)], dtype="int64"
                        ),
                    }
                )

    return part.mapInPandas(
        kernel,
        f"{key_col} bigint, day date, total_cents bigint, level_cents bigint, "
        "trend_cents bigint, forecast_next_cents bigint",
    )


def holt_winters(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_milli: int = 300,
    beta_milli: int = 100,
    gamma_milli: int = 200,
    period: int = 7,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (level + trend +
    day-of-week seasonality) over per-key daily totals — the
    weekly-rhythm forecaster above :func:`holt_trend` — in EXACT
    integer arithmetic.  Seasonal state is keyed by CALENDAR phase
    (epoch-day mod ``period``), not series position, so gapped series
    stay phase-aligned; phases start at the additive-neutral 0 and
    warm up as observed:

        phase p_t = epochday(day_t) mod m
        l_1 = x_1,  b_1 = 0,  s_i = 0
        l_t = (α·(x_t − s[p_t]) + (1000−α)·(l_{t−1} + b_{t−1})) fdiv 1000
        b_t = (β·(l_t − l_{t−1}) + (1000−β)·b_{t−1}) fdiv 1000
        s[p_t] ← (γ·(x_t − l_t) + (1000−γ)·s[p_t]) fdiv 1000

    forecast_next = l_t + b_t + s[(p_t+1) mod m] (the one-step-ahead
    prediction for the NEXT calendar day, read from the post-update
    seasonal array).  Same engine-exactness discipline as holt_trend:
    one key-sorted Arrow ``mapInPandas`` pass Spark-side, the
    identical RECURSIVE CTE oracle-side with every division floored
    via the non-negative-mod idiom (deltas go negative routinely).

    Output: (key, day, total_cents, level_cents, trend_cents,
    seasonal_cents, forecast_next_cents).

    Scale shape: one daily partial-agg shuffle + one key-sorted Arrow
    pass; per-key state is level+trend+m ints — bounded."""
    import datetime

    import pandas as pd

    a = int(alpha_milli)
    b_ = int(beta_milli)
    g = int(gamma_milli)
    m = int(period)
    epoch = datetime.date(1970, 1, 1)
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)))
        .select(
            F.col(key_col).cast("bigint").alias("_k"),
            day.alias("day"),
            F.col(value_col).cast("decimal(12,2)").alias("_v"),
        )
        .groupBy("_k", "day")
        .agg((F.sum("_v") * 100).cast("bigint").alias("total_cents"))
    )
    part = daily.repartition("_k").sortWithinPartitions("_k", "day")

    def fdiv(n):
        return (n - ((n % 1000 + 1000) % 1000)) // 1000

    def kernel(batches):
        cur, lev, tr, s = None, None, 0, [0] * m
        for pdf in batches:
            out = {"k": [], "day": [], "x": [], "lv": [], "t": [],
                   "sc": [], "fc": []}
            for k, d, x in zip(pdf["_k"], pdf["day"], pdf["total_cents"]):
                k, x = int(k), int(x)
                if k != cur:
                    cur, lev, tr, s = k, None, 0, [0] * m
                p = (d - epoch).days % m
                if lev is None:
                    lev, tr = x, 0
                    s[p] = 0
                else:
                    prev = lev
                    lev = fdiv(a * (x - s[p]) + (1000 - a) * (lev + tr))
                    tr = fdiv(b_ * (lev - prev) + (1000 - b_) * tr)
                    s[p] = fdiv(g * (x - lev) + (1000 - g) * s[p])
                out["k"].append(k)
                out["day"].append(d)
                out["x"].append(x)
                out["lv"].append(lev)
                out["t"].append(tr)
                out["sc"].append(s[p])
                out["fc"].append(lev + tr + s[(p + 1) % m])
            if out["k"]:
                yield pd.DataFrame(
                    {
                        key_col: pd.Series(out["k"], dtype="int64"),
                        "day": out["day"],
                        "total_cents": pd.Series(out["x"], dtype="int64"),
                        "level_cents": pd.Series(out["lv"], dtype="int64"),
                        "trend_cents": pd.Series(out["t"], dtype="int64"),
                        "seasonal_cents": pd.Series(out["sc"], dtype="int64"),
                        "forecast_next_cents": pd.Series(out["fc"], dtype="int64"),
                    }
                )

    return part.mapInPandas(
        kernel,
        f"{key_col} bigint, day date, total_cents bigint, level_cents bigint,"
        " trend_cents bigint, seasonal_cents bigint, forecast_next_cents bigint",
    )
