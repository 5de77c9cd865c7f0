"""Skew mitigation for hot keys (the 100 TB posture, SURVEY.md §7).

AQE's skew-join splitting handles most cases at runtime; these helpers
cover the two patterns AQE can't fix:

- ``salted_aggregate``: a hot groupBy key overwhelms one reducer.  Adds a
  deterministic salt to fan the key across ``n_salts`` partial groups,
  then re-aggregates.  Only works for algebraic aggregates (sum/count/
  min/max) — exactly the ones with map-side partial merge.
- ``salted_broadcast_join``: replicating the small side per salt so a
  skewed big-side key spreads over ``n_salts`` tasks even under a
  sort-merge join (when the small side is too big to broadcast whole but
  its per-salt replication still fits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df_cols: list[str], n_salts: int) -> Column:
    """Deterministic salt: hash of the full row spread over n_salts.
    Deterministic (vs rand()) so retries and replays agg identically."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df_cols]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    count_alias: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate: sums and counts only (algebraic).

    phase 1 groups by (keys + salt) — hot keys split across n_salts
    reducers; phase 2 re-merges the partials by keys.  Result is
    bit-identical to the plain aggregate for decimal/long inputs.
    """
    sum_cols = sum_cols or {}
    salted = df.withColumn("_salt", _salt(df.columns, n_salts))
    partial_aggs = [F.sum(F.col(c)).alias(f"_p_{a}") for c, a in sum_cols.items()]
    if count_alias:
        partial_aggs.append(F.count("*").alias("_p_cnt"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"_p_{a}").alias(a) for a in sum_cols.values()]
    if count_alias:
        final_aggs.append(F.sum("_p_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join where the big side has hot keys: salt the big side rows,
    explode the small side once per salt value, join on (key, salt)."""
    b = big.withColumn("_salt", _salt(big.columns, n_salts))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")))
    return b.join(s, [key, "_salt"]).drop("_salt")
