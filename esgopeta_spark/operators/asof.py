"""As-of and range joins — operators Spark lacks natively, composed from
built-ins (SURVEY.md §4.3 strategy (a): composition before UDFs).

- ``asof_join``: for each left row, the latest right row at-or-before its
  timestamp (per key).  Implemented as union + window last-value-carry —
  ONE shuffle on (key), no range explosion, no cross join; this is the
  standard scalable formulation (a point-in-time join at 100 TB keys on
  the same partitioning both sides).
- ``range_join``: interval containment via bucketed equi-join — the
  classic bucket trick that turns a non-equi predicate into an equi key
  plus residual filter, so Catalyst never falls back to nested-loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Point-in-time join: latest right value with right_ts <= left_ts.

    Union both sides tagged, sort within key by (ts, side) and carry the
    last seen right values forward; keep left rows.  last(ignorenulls)
    over an ordered window is the carry.

    Duplicate right rows at the same (key, ts) have no inherent order; the
    window order includes the right value struct itself as a final
    tiebreak, so the carried value is deterministically the GREATEST
    (value-struct-ordered) of the duplicates rather than whichever
    partition happened to sort last.
    """
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in right_value_cols],
        F.lit(None).cast("string").alias("_tie"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(-1).alias("_side"),  # right sorts before left at equal ts (<=)
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
        F.to_json(F.struct(*[F.col(c) for c in right_value_cols])).alias("_tie"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_k",
        "_side",
        "_l",
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}") for c in right_value_cols],
    )
    out = carried.filter(F.col("_side") == 0).select(
        F.col("_l.*"), *[F.col(f"_rv_{c}").alias(c) for c in right_value_cols]
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """points ⋈ intervals on start <= point < end, via bucketing.

    Intervals explode to the buckets they overlap; points join on their
    bucket (equi!) then the exact residual predicate filters.  Interval
    skew = more bucket rows, never a quadratic join.
    """
    b = float(bucket_width)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b).cast("long"),
                F.floor((F.col(end_col) - F.lit(1e-9)) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / b).cast("long"))
    joined = pt.join(iv, "_bucket").filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("_bucket")
