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

    The parquet stores TIMESTAMP(NANOS) (read as long under nanosAsLong),
    so ts is restored to a real timestamp here, same as read_table.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    import os
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    static = spark.read.parquet(src)
    path = src
    if os.path.isfile(src):
        # the file-stream source requires a directory; expose the single
        # parquet file through a symlink dir
        d = tempfile.mkdtemp(prefix="esgopeta_events_stream_")
        os.symlink(src, os.path.join(d, "events.parquet"))
        path = d
    stream = spark.readStream.schema(static.schema).parquet(path)
    if dict(static.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def deduped(updates: DataFrame, watermark_col: str = "recv_ts", delay: str = "10 minutes") -> DataFrame:
    """Streaming dedup of repeated (soul, field, value, state) updates —
    gun/scoped_fetch.go:174-178 with a watermark bounding state size."""
    return updates.withWatermark(watermark_col, delay).dropDuplicates(
        ["soul", "field", "value_type", "value_number_raw", "value_string", "value_bool", "value_relation", "state"]
    )
