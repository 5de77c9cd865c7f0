"""Pin the timestamp ingestion contract.

The driver's testdata has shipped ts columns as TIMESTAMP(NANOS) (round 1)
and as timestamp[us]-without-tz (round 2); either way `read_table` must
surface plain TIMESTAMP — never bigint, never timestamp_ntz — or every
unix_millis()/window()/session_window() call site breaks at analysis time.

Also smoke-analyzes every registered catalog entry (`.schema` only, no
execution) so a future physical-type change in the testdata turns into a
red test naming the entry instead of a silent driver-gate kill.
"""

from __future__ import annotations

import os

import pytest

from esgopeta_spark.session import _NANOS_TS_COLUMNS, read_table
from tests.conftest import SF_SMOKE

ALL_SFS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir_any", ALL_SFS)
def test_ts_columns_are_timestamp(spark, sf_dir_any):
    for table, cols in _NANOS_TS_COLUMNS.items():
        dtypes = dict(read_table(spark, sf_dir_any, table).dtypes)
        for c in cols:
            assert dtypes[c] == "timestamp", (
                f"{sf_dir_any}/{table}.{c} is {dtypes[c]!r}; read_table must "
                "normalize every ts column to plain TIMESTAMP"
            )


def test_unix_millis_resolves_on_events(spark):
    from pyspark.sql import functions as F

    e = read_table(spark, SF_SMOKE, "events")
    row = e.select(F.unix_millis("ts").alias("ms")).limit(1).collect()
    assert row and row[0]["ms"] > 0


def test_ntz_cast_branch_covers_driver_built_sessions(spark):
    """Belt-and-braces: even if the inferTimestampNTZ conf were absent at scan
    time, the read_table cast branch must yield TIMESTAMP.  Simulate by reading
    with the conf flipped on, through read_table."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        dtypes = dict(read_table(spark, SF_SMOKE, "events").dtypes)
        # read_table re-sets the conf to false itself; whichever branch fired,
        # the contract holds
        assert dtypes["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_foreign_timezone_session_reads_correct_epochs(spark):
    """A driver-built session may carry a non-UTC timezone; read_table must
    still surface the stored UTC instants (it re-pins session tz to UTC at
    runtime, keeping the NTZ cast value-preserving)."""
    import duckdb
    from pyspark.sql import functions as F

    ns = spark.newSession()
    ns.conf.set("spark.sql.session.timeZone", "America/New_York")
    e = read_table(ns, SF_SMOKE, "events")
    got = e.select(F.min(F.unix_millis("ts")).alias("ms")).collect()[0]["ms"]
    want = duckdb.connect().execute(
        f"SELECT MIN(CAST(epoch_ms(ts) AS BIGINT)) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    assert got == want


def test_all_registry_entries_analyze(spark):
    """Every catalog entry must at least pass Catalyst analysis (~schema
    resolution) against current testdata.  Catches dtype drift in ANY entry
    without paying execution cost."""
    from esgopeta_spark.plans import REGISTRY

    failures = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, SF_SMOKE).schema
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "entries failed analysis:\n" + "\n".join(failures)
