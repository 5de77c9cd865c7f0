"""Streaming write path: B1's "foreachBatch: HAM-merge upsert into the
quads table" (SURVEY.md §3.3 Spark mapping; reference put flow
gun/scoped_put.go:50-185 + storage merge gun/storage.go:91-122).

Each micro-batch of update messages is merged into the bucketed quads
store (sources/io.py layout) with these scale properties:

- **bucket-local rewrite**: only the ``soul_bucket`` partitions touched
  by the batch are read and overwritten (dynamic partition overwrite);
  the other ``n_buckets - 1`` directories are never scanned.  At 100 TB
  a micro-batch touches a bounded set of buckets, so upsert cost tracks
  batch size, not store size.
- **idempotent by construction**: HAM merge is associative, commutative
  and idempotent, so foreachBatch's at-least-once replay converges to
  the same store (no dedup bookkeeping; the reference needs
  ``storedPuts`` for this, gun/message.go:26-34 — idempotence makes it
  unnecessary, SURVEY.md §4.1).
- **future-state deferral** (gun/storage.go:107-117): rows whose state
  is ahead of the batch's ``as_of`` clock are parked in a ``_pending``
  side-store and re-offered to every later batch until their time
  arrives — the batch re-expression of the reference's scheduled retry.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esgopeta_spark.ham import ham_apply_updates, ham_merge
from esgopeta_spark.sources.io import DEFAULT_BUCKETS, _bucket_expr
from esgopeta_spark.types import QUAD_SCHEMA, VALUE_COLUMNS

_QUAD_COLS = [f.name for f in QUAD_SCHEMA.fields]


def _pending_dir(store_path: str) -> str:
    return os.path.join(store_path, "_pending")


def ham_upsert_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    as_of_ms: float | None = None,
) -> None:
    """Merge one batch of updates (UPDATE_SCHEMA or quad-shaped rows)
    into the bucketed quads store at ``store_path``.  Callable directly
    (batch put) or from foreachBatch (streaming put)."""
    pending = _pending_dir(store_path)
    incoming = batch.select(*_QUAD_COLS)
    # explicit existence check, not a bare except: a real read failure
    # (corrupt file, permissions) must propagate, or deferred updates are
    # silently dropped.  Local-path check is correct here because the
    # pending side-store lives next to the local quads store; an object-
    # store deployment swaps this for a FileSystem.exists call.
    if os.path.isdir(pending):
        carried = spark.read.parquet(pending).select(*_QUAD_COLS)
        incoming = incoming.unionByName(carried)

    store_exists = os.path.exists(os.path.join(store_path, "_quads_meta.json"))
    if as_of_ms is None:
        as_of_ms = time.time() * 1000.0
    eligible = incoming.filter(F.col("state") <= F.lit(float(as_of_ms)))
    deferred = incoming.filter(F.col("state") > F.lit(float(as_of_ms)))

    eligible = eligible.withColumn("soul_bucket", _bucket_expr(n_buckets))
    touched = [r["soul_bucket"] for r in eligible.select("soul_bucket").distinct().collect()]
    if touched:
        if store_exists:
            existing = (
                spark.read.parquet(store_path)
                .filter(F.col("soul_bucket").isin(touched))
                .select(*_QUAD_COLS)
            )
            merged = ham_merge(existing.unionByName(eligible.select(*_QUAD_COLS)))
        else:
            merged = ham_merge(eligible.select(*_QUAD_COLS))
        # materialize BEFORE overwriting: the write would otherwise scan
        # the very partitions it is replacing
        out = (
            merged.withColumn("soul_bucket", _bucket_expr(n_buckets))
            .repartition("soul_bucket")
            .localCheckpoint()
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("soul_bucket")
            .parquet(store_path)
        )
        if not store_exists:
            with open(os.path.join(store_path, "_quads_meta.json"), "w") as f:
                json.dump({"n_buckets": n_buckets}, f)

    # park future-state rows for the next batch (overwrite = the carry
    # set is recomputed whole each time; checkpoint first, same reason)
    deferred = deferred.select(*_QUAD_COLS).localCheckpoint()
    deferred.write.mode("overwrite").parquet(pending)


def stream_put(
    updates: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    as_of_fn: Callable[[], float] | None = None,
):
    """B1 as a streaming query: update stream -> HAM-merge upsert sink.

    Returns the started StreamingQuery; acks ≡ batch commits to the
    checkpoint (SURVEY.md §3.3 — per-peer acks have no analog under a
    single source of truth).  ``as_of_fn`` pins the deferral clock for
    deterministic tests; default is wall-clock ms, like the reference's
    ``StateNow()``.
    """
    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        ham_upsert_batch(
            batch_df.sparkSession,
            batch_df,
            store_path,
            n_buckets=n_buckets,
            as_of_ms=(as_of_fn() if as_of_fn is not None else None),
        )

    return (
        updates.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
