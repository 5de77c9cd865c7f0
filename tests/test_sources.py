"""E1 sources/sinks: format round-trips and the bucketed quads layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from esgopeta_spark.sources import read_any, read_quads, write_quads
from esgopeta_spark.types import QUAD_SCHEMA, encode_value


def test_quads_roundtrip_and_bucket_pruning(spark, tmp_path):
    rows = [
        {"soul": f"s{i}", "field": f"f{j}", **encode_value(i * 10 + j), "state": 1.0}
        for i in range(20)
        for j in range(3)
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    path = str(tmp_path / "quads")
    write_quads(quads, path, n_buckets=8)

    back = read_quads(spark, path)
    assert back.count() == 60
    assert [f.name for f in back.schema.fields] == [f.name for f in QUAD_SCHEMA.fields]

    one = read_quads(spark, path, soul="s7")
    got = {(r["field"], r["value_number"]) for r in one.collect()}
    assert got == {("f0", 70.0), ("f1", 71.0), ("f2", 72.0)}
    # pruning proof: the physical plan must carry a partition filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "soul_bucket" in plan


def test_read_any_formats(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    for fmt in ["parquet", "json", "csv"]:
        p = str(tmp_path / fmt)
        df.write.format(fmt).option("header", "true").save(p)
        back = read_any(spark, p, fmt=fmt)
        assert back.count() == 10
        vals = {(int(r["id"]), int(r["v"])) for r in back.collect()}
        assert vals == {(i, 2 * i) for i in range(10)}
