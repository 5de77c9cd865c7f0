"""Pin the timestamp ingestion contract.

The driver's testdata has shipped ts columns as TIMESTAMP(NANOS) (round 1)
and as timestamp[us]-without-tz (round 2); either way `read_table` must
surface plain TIMESTAMP — never bigint, never timestamp_ntz — or every
unix_millis()/window()/session_window() call site breaks at analysis time.
Normalization is structural (any temporal-named column, any table), and
the synthetic drift fixtures below exercise every branch — nanos-bigint,
micros-NTZ, INT96, date32, ISO string — so the NEXT physical-type drift
is already covered, not patched after it breaks a round.

Also smoke-analyzes every registered catalog entry (`.schema` only) so a
future physical-type change in the testdata turns into a red test naming
the entry instead of a silent driver-gate kill.
"""

from __future__ import annotations

import os

import pytest

from esgopeta_spark.session import _is_temporal_name, read_table
from tests.conftest import SF_SMOKE

# the temporal columns the current testdata actually ships
KNOWN_TS_COLUMNS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}

ALL_SFS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


def test_temporal_name_heuristic():
    for c in ("ts", "o_orderdate", "l_shipdate", "created_at", "event_ts", "l_commitdate", "load_time"):
        assert _is_temporal_name(c), c
    # every non-temporal column in the current testdata must NOT match —
    # a false positive would rewrite a legit column
    for t, cols in {
        "region": ["r_regionkey", "r_name"],
        "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
        "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
        "lineitem": ["l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"],
        "events": ["event_id", "user_id", "event_type", "value", "props"],
        "documents": ["doc_id", "text", "lang", "source", "n_chars"],
        "embeddings": ["vec_id", "embedding", "label"],
    }.items():
        for c in cols:
            assert not _is_temporal_name(c), f"{t}.{c} false-positives as temporal"


@pytest.mark.parametrize("sf_dir_any", ALL_SFS)
def test_ts_columns_are_timestamp(spark, sf_dir_any):
    for table, cols in KNOWN_TS_COLUMNS.items():
        dtypes = dict(read_table(spark, sf_dir_any, table).dtypes)
        for c in cols:
            assert dtypes[c] == "timestamp", (
                f"{sf_dir_any}/{table}.{c} is {dtypes[c]!r}; read_table must "
                "normalize every ts column to plain TIMESTAMP"
            )


# ---------------------------------------------------------------------------
# synthetic drift fixtures: every physical type the driver could ship next
# ---------------------------------------------------------------------------

_EPOCH_MS = [1704067200000, 1704070800123, 1704153600999]  # 2024-01-01T00:00Z + offsets


def _write_fixture(dirpath: str, arrow_array, int96: bool = False) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": arrow_array})
    pq.write_table(
        table,
        os.path.join(dirpath, "events.parquet"),
        use_deprecated_int96_timestamps=int96,
    )


def _drift_cases():
    import pyarrow as pa

    us = [ms * 1000 for ms in _EPOCH_MS]
    return {
        "nanos": (pa.array([u * 1000 for u in us], pa.timestamp("ns")), False, _EPOCH_MS),
        "micros_ntz": (pa.array(us, pa.timestamp("us")), False, _EPOCH_MS),
        "micros_utc": (pa.array(us, pa.timestamp("us", tz="UTC")), False, _EPOCH_MS),
        "int96": (pa.array(us, pa.timestamp("us", tz="UTC")), True, _EPOCH_MS),
        "date32": (
            pa.array([0, 1, 2], pa.date32()),
            False,
            [0, 86400000, 172800000],  # midnight UTC per DuckDB's date->ts promotion
        ),
        "string_iso": (
            pa.array(["2024-01-01 00:00:00", "2024-01-01 01:00:00.123", "2024-01-02 00:00:00.999"]),
            False,
            _EPOCH_MS,
        ),
    }


@pytest.mark.parametrize("case", ["nanos", "micros_ntz", "micros_utc", "int96", "date32", "string_iso"])
def test_drift_fixture_normalizes_to_timestamp(spark, tmp_path, case):
    from pyspark.sql import functions as F

    arr, int96, want_ms = _drift_cases()[case]
    _write_fixture(str(tmp_path), arr, int96=int96)
    df = read_table(spark, str(tmp_path), "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp", f"{case}: ts is {dtypes['ts']!r}"
    got = [r["ms"] for r in df.select(F.unix_millis("ts").alias("ms")).orderBy("event_id").collect()]
    assert got == want_ms, f"{case}: {got} != {want_ms}"


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
    resolution) against current testdata.  Catches dtype drift in ANY entry.

    Mostly execution-free (.schema only); known exceptions that DO run small
    bounded Spark jobs inside fn() because their semantics need a driver-side
    scalar or replay loop: graph_ttl_tracking (point collect), the pagerank /
    connected-components entries (iterative driver loops), and the round-4
    additions built on those loops — dedup_semantic_kmeans (k-means +
    components) and graph_bfs_hops_nation0 (per-round frontier emptiness
    checks), plus bpe_vocab_merges (batched merge rounds, each a top-K
    collect).  graph_put_replay left this list in r5: the pure-put fast
    path makes its 35-put replay execution-free
    (tests/test_graph.py::test_put_replay_entry_is_execution_free).
    Wall-clock is bounded by tiny SF_SMOKE inputs."""
    from esgopeta_spark.plans import REGISTRY

    failures = []
    for name, entry in REGISTRY.items():
        try:
            entry.fn(spark, SF_SMOKE).schema
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "entries failed analysis:\n" + "\n".join(failures)
