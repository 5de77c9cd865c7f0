"""Deterministic mergeable sketches (approximate aggregates with exact
cross-engine oracles).

Spark's production approximate-distinct is HyperLogLog
(``approx_count_distinct``, tested against a tolerance in
tests/test_llm_ops.py) — but HLL's register layout is engine-internal,
so it cannot be oracle-hash-checked.  KMV (k minimum values; Bar-Yossef
et al. 2002, "Counting distinct elements in a data stream" — public) is
the sketch whose ENTIRE state is portable arithmetic: hash every key,
keep the k smallest distinct hash values, estimate

    D ≈ (k - 1) * M / h_k        (h_k = the k-th smallest hash, M = hash range)

Everything here is exact int64 arithmetic — two Lehmer-RNG scramble
steps mod the Mersenne prime 2^31-1 and floor division — so DuckDB
reproduces the estimate bit-for-bit (catalog
``agg_kmv_distinct_sketch``), unlike any float/HLL formulation.  (A
single multiply-mod is NOT enough: for keys far below the modulus the
product never wraps, the "hash" is just a scaled key, and the estimator
explodes — caught by the accuracy test.)  The k-smallest state is MERGEABLE (union = k
smallest of the concatenation), which is what makes the sketch shape
right at 100 TB: per-partition top-k combines map-side, only k values
per group cross the shuffle.  A cryptographic-quality hash would improve
the estimator's variance; the multiplicative hash keeps both engines
bit-identical without either having the other's hash builtin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KMV_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1 (the Lehmer modulus)
_A1, _A2 = 48271, 69621  # classic full-period Lehmer multipliers


def kmv_hash(col) -> "F.Column":
    """Deterministic 31-bit hash, 1-based so the estimator never divides
    by zero.  The key is first pmod-ed into [0, M) — without it a key
    >= 2^63/48271 overflows the first multiply (ANSI throw / silent wrap)
    and a negative key yields a non-positive "hash"; with it every
    intermediate product stays under 2^48.  Two Lehmer scramble rounds
    mix thoroughly enough for the estimator; identical arithmetic runs
    in DuckDB."""
    h0 = F.pmod(col.cast("bigint"), F.lit(KMV_MOD))
    h1 = (h0 * F.lit(_A1)) % F.lit(KMV_MOD)
    return (h1 * F.lit(_A2)) % F.lit(KMV_MOD) + F.lit(1)


def kmv_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group approximate distinct count via a KMV sketch.

    Returns (group_cols..., n_kept, est_distinct): groups with fewer
    than k distinct keys report exactly (the sketch IS the value set);
    larger groups estimate ``(k-1) * M div h_k``.

    Plan: distinct (group, hash) — one partial-agg shuffle — then a
    per-group rank window truncated at k.  At extreme scale, swap the
    full distinct for a per-partition k-smallest combine (the sketch's
    mergeability); this formulation keeps the exact oracle while showing
    the same state shape.
    """
    hashed = (
        df.select(*group_cols, kmv_hash(F.col(key_col)).alias("_h")).distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    ranked = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
        )
        .select(
            *group_cols,
            "n_kept",
            F.coalesce(
                F.expr(f"(({k} - 1) * CAST({KMV_MOD} AS BIGINT)) div _hk").cast("bigint"),
                F.col("n_kept"),
            ).alias("est_distinct"),
        )
    )


def kmv_state(df: DataFrame, key_col: str, group_cols: list[str], k: int = 64) -> DataFrame:
    """The raw mergeable sketch state: the k smallest distinct hashes per
    group, one row per kept hash — union two states and re-truncate to k
    to merge (pinned by tests/test_llm_ops.py kmv mergeability test)."""
    hashed = df.select(*group_cols, kmv_hash(F.col(key_col)).alias("kmv_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("kmv_h").asc())
    return hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")
