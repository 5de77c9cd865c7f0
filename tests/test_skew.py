"""Skew-mitigation helpers: salted results must equal plain results."""

from __future__ import annotations

from pyspark.sql import functions as F

from esgopeta_spark.operators.skew import salted_aggregate, salted_broadcast_join
from esgopeta_spark.session import read_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(12,2)").alias("qty")
    )
    plain = {
        (r["l_returnflag"]): (r["s"], r["n"])
        for r in li.groupBy("l_returnflag").agg(F.sum("qty").alias("s"), F.count("*").alias("n")).collect()
    }
    salted = {
        (r["l_returnflag"]): (r["total_qty"], r["n_rows"])
        for r in salted_aggregate(
            li, ["l_returnflag"], sum_cols={"qty": "total_qty"}, count_alias="n_rows", n_salts=8
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    p = read_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    plain = li.join(p, "l_partkey").groupBy("p_brand").count().collect()
    salted = salted_broadcast_join(li, p, "l_partkey", n_salts=4).groupBy("p_brand").count().collect()
    assert {(r["p_brand"], r["count"]) for r in plain} == {(r["p_brand"], r["count"]) for r in salted}
