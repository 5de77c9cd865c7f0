"""SparkSession construction with scale-minded defaults.

Test/bench hardware is local[32]; the configs below are chosen so the
same code runs unchanged on a multi-executor cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), broadcast
threshold sized for dimension tables, Arrow enabled for the Pandas-UDF
slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "esgopeta-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's testdata parquet has stored ts columns as TIMESTAMP(NANOS)
        # in one round and timestamp[us]-no-tz in another; normalize BOTH to
        # plain TIMESTAMP: nanos read as long and converted in read_table,
        # micros-without-tz read as TIMESTAMP (not TIMESTAMP_NTZ) so
        # unix_millis()/window() keep working under the UTC session tz
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# testdata columns physically stored as TIMESTAMP(NANOS); surfaced as proper
# timestamps by read_table (micros truncation — exact for this data)
_NANOS_TS_COLUMNS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Parquet scan; keep it bare so Catalyst pushes filters/pruning into it.

    The ingestion contract: every ts column in _NANOS_TS_COLUMNS surfaces as
    plain TIMESTAMP (never bigint, never timestamp_ntz), whatever the parquet
    physical type is.  Nanos-timestamp columns arrive as long (see nanosAsLong
    conf) and are converted here; micros-no-tz columns arrive as TIMESTAMP_NTZ
    when the session lacks the inferTimestampNTZ conf and are cast here.  Both
    fixes are cheap projected expressions that don't block predicate pushdown
    on other columns.
    """
    from pyspark.sql import functions as F

    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        # UTC keeps the NTZ->timestamp cast below value-preserving and
        # makes unix_millis/window outputs tz-independent in any session
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:  # the driver may hand us a session built without these confs
            spark.conf.set(conf, val)
        except Exception:
            pass
    df = spark.read.parquet(table_path(sf_dir, name))
    dtypes = dict(df.dtypes)
    for c in _NANOS_TS_COLUMNS.get(name, []):
        if c not in df.columns:
            continue
        if dtypes[c] == "bigint":
            # integer `div`, not `/`: double division rounds ns near the
            # microsecond boundary, silently shifting timestamps by 1us
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes[c] == "timestamp_ntz":
            # session tz is UTC, so NTZ wall-clock == the stored UTC instant
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# operators whose presence in the analyzed logical plan means the .rdd
# partition probe would finalize (and thus EXECUTE) upstream AQE stages
_NON_SCAN_OPS = (
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Deduplicate",
    "Distinct",
    "Repartition",
    "GlobalLimit",
    "FlatMapGroups",
    "MapInPandas",
)


def is_scan_stage(df) -> bool:
    """True iff the plan is a bare scan pipeline (scan/filter/project/etc.)
    whose partition count can be probed without executing anything."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return not any(op in plan for op in _NON_SCAN_OPS)


def ensure_min_partitions(df, min_parts: int | None = None):
    """Widen tiny scans so per-row-heavy projections parallelize.

    Small single-row-group parquet files arrive as ONE input partition;
    any expensive projection over them (minhash, shingle hashing, vector
    math) then runs on one core.  Repartition only when the plan is
    narrower than the session's parallelism — on a real cluster a 100 TB
    scan already has thousands of splits and this is a no-op (no shuffle
    is added).

    Guarded: on a plan that already contains a shuffle/exchange-producing
    operator the ``.rdd`` partition probe would finalize AQE and
    MATERIALIZE the upstream stages — executing the query once just to
    count partitions — so such plans are returned unchanged (they already
    have shuffle-partitions-many partitions downstream anyway).
    """
    if not is_scan_stage(df):
        return df
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df
