"""Update-stream sources (reference group C reinterpreted).

The reference's wire layer (gun/message.go, gun/websocket.go) delivers
JSON update messages peer-to-peer; Spark owns distribution, so the wire
protocol survives as the *schema* of a streaming source.  File-based
sources are what the test environment supports; the same code takes a
Kafka topic by swapping the reader (``format("kafka")`` + from_json) —
the update schema is the contract, not the transport.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esgopeta_spark.types import UPDATE_SCHEMA


def read_update_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """readStream over a directory of update files (UPDATE_SCHEMA).

    maxFilesPerTrigger=1 gives deterministic replay of golden logs in
    tests; production would leave it unset and let AQE-sized micro-batches
    flow.
    """
    reader = spark.readStream.schema(UPDATE_SCHEMA).option("maxFilesPerTrigger", 1)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported stream format {fmt!r}")


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream view of the events table (for windowed-agg streams).

    Applies the same ts-normalization contract as session.read_table:
    whatever the parquet physical type (nanos-as-long or micros-no-tz),
    the stream's ts column is a plain TIMESTAMP.
    """
    import hashlib
    import os
    import tempfile

    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            pass

    src = os.path.join(sf_dir, "events.parquet")
    static = spark.read.parquet(src)
    path = src
    if os.path.isfile(src):
        # the file-stream source requires a directory; expose the single
        # parquet file through a symlink dir.  Deterministic per-source
        # path (not mkdtemp) so repeated calls REUSE one dir instead of
        # leaking a new one per call.
        tag = hashlib.sha256(os.path.abspath(src).encode()).hexdigest()[:16]
        d = os.path.join(tempfile.gettempdir(), f"esgopeta_events_stream_{tag}")
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "events.parquet")
        if not os.path.islink(link):
            os.symlink(src, link)
        path = d
    stream = spark.readStream.schema(static.schema).parquet(path)
    ts_dtype = dict(static.dtypes).get("ts")
    if ts_dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_dtype == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def read_update_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka transport for the update stream (reference C7 adapter:
    gun/websocket.go:90-161 re-expressed as a Spark source swap).

    The wire contract is the UPDATE_SCHEMA JSON document in the record
    value — identical to what the file source reads; everything downstream
    (dedup, HAM merge, upsert sink) is transport-agnostic.  Partitioning:
    producers should key records by ``soul`` so one soul's updates stay
    ordered within a partition; the HAM merge is order-independent anyway
    (semilattice), so cross-partition reordering only affects emission
    timing, never the converged value.

    Requires the spark-sql-kafka package on the classpath; raises the
    underlying AnalysisException if the kafka source is unavailable (this
    container ships without it — see tests/test_sources.py for the
    availability-gated test).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_update_records(raw)


def parse_update_records(raw: DataFrame) -> DataFrame:
    """Decode kafka-shaped records (``value`` binary/string JSON +
    ``timestamp``) into UPDATE_SCHEMA rows.

    Split out of ``read_update_stream_kafka`` so the WIRE PARSING is
    testable without the kafka package on the classpath (this container
    ships without it): the projection is identical whether ``raw`` came
    from ``format("kafka")`` or a static frame with the same two columns
    — tests/test_sources.py round-trips real JSON record bytes through
    it in batch mode.
    """
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), UPDATE_SCHEMA).alias("_u"),
        F.col("timestamp").alias("_kafka_ts"),
    )
    # recv_ts falls back to broker receive time when the producer omits it
    return parsed.select("_u.*", "_kafka_ts").withColumn(
        "recv_ts", F.coalesce(F.col("recv_ts"), F.col("_kafka_ts"))
    ).drop("_kafka_ts")


def deduped(updates: DataFrame, watermark_col: str = "recv_ts", delay: str = "10 minutes") -> DataFrame:
    """Streaming dedup of repeated (soul, field, value, state) updates —
    gun/scoped_fetch.go:174-178 with a watermark bounding state size."""
    return updates.withWatermark(watermark_col, delay).dropDuplicates(
        ["soul", "field", "value_type", "value_number_raw", "value_string", "value_bool", "value_relation", "state"]
    )
