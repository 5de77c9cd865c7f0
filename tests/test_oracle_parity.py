"""Mimic the driver's correctness gate: run every catalog query on Spark
AND its DuckDB oracle, compare row count, column names, and values
(order-insensitive, column-name-sorted) — at sf0.001 by default so the
suite stays fast; set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 to
run the real gate size."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esgopeta_spark.plans import REGISTRY

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{PARITY_SF}/{t}.parquet'")
    return con


def canon(val):
    """Normalize a cell for comparison (mirror of a value-hash)."""
    import datetime
    import decimal

    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)  # full precision: we require bitwise equality
    if isinstance(val, decimal.Decimal):
        return repr(float(val))
    if isinstance(val, datetime.datetime):
        return val.replace(tzinfo=None).isoformat()
    if isinstance(val, datetime.date):
        return val.isoformat()
    return val


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, PARITY_SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc, sr = frame_to_rows(scols, srows)
    dc, dr = frame_to_rows(dcols, drows)
    mismatches = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sr[mismatches[0]]} duckdb={dr[mismatches[0]]} cols={sc}"
    )


def test_no_oracle_queries_still_run(spark):
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            df = spec.fn(spark, PARITY_SF)
            assert df.count() >= 0, name
