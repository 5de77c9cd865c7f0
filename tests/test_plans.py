"""Physical-plan audits: the scale posture is a claim about PLANS, not
results — these tests pin it.  Each assertion is something that, if it
regressed, would silently cost 10-100x at 100 TB while every correctness
test stayed green: filters/projection no longer reaching the parquet
scan, a dimension join falling back to sort-merge, an LSH candidate join
degenerating into a cartesian product."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from esgopeta_spark.session import read_table


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_and_projection_pushdown(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    p = plan_of(q)
    assert "PushedFilters: [" in p and "GreaterThan(l_quantity" in p, p
    # column pruning: the scan must not read the full 11-column schema
    assert "l_extendedprice" not in p.split("ReadSchema")[1].splitlines()[0]


def test_partition_filter_pushdown_on_ts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    # ts is reconstructed from nanos (projection), but event_type is raw ->
    # its filter must still reach the scan
    q = ev.filter(F.col("event_type") == "click").select("event_id")
    p = plan_of(q)
    assert "EqualTo(event_type,click)" in p, p


def test_dimension_join_broadcasts(spark, sf_dir):
    from esgopeta_spark.plans import REGISTRY

    q3 = REGISTRY["q3_shipping_priority"].fn(spark, sf_dir)
    p = plan_of(q3)
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p


def test_lsh_candidate_join_is_equi_not_cartesian(spark, sf_dir):
    from esgopeta_spark.operators.dedup import minhash_lsh_candidates

    d = read_table(spark, sf_dir, "documents")
    p = plan_of(minhash_lsh_candidates(d))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the self-join must key on (band, band-hash)
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_range_join_is_bucketed_equi(spark, sf_dir):
    from esgopeta_spark.operators.asof import range_join

    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", (F.col("s_acctbal") - 50).alias("_lo"), (F.col("s_acctbal") + 50).alias("_hi")
    )
    p = plan_of(range_join(cust, supp, "c_acctbal", "_lo", "_hi", 100.0))
    assert "CartesianProduct" not in p, "range join fell back to a cross product"


def test_topk_cosine_broadcasts_queries_not_corpus(spark, sf_dir):
    from esgopeta_spark.operators.similarity import topk_cosine

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    p = plan_of(topk_cosine(emb, q, k=5, dim=64))
    # non-equi (!=) join: acceptable only as broadcast-nested-loop with the
    # tiny QUERY side broadcast; a cartesian of corpus x corpus is not
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p


def test_agg_has_partial_aggregation(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"))
    p = plan_of(q)
    # map-side combine: two HashAggregate NODES around the exchange
    # (formatted explain prints each node twice: tree line + detail header)
    import re

    n_aggs = len(re.findall(r"^\(\d+\) HashAggregate", p, re.M))
    assert n_aggs >= 2, p


def test_asof_join_single_shuffle_on_key(spark, sf_dir):
    from esgopeta_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    r = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("value").alias("cv")
    )
    p = plan_of(asof_join(l, r, "user_id", "ts", "cts", ["cts", "cv"]))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # union + window carry: exactly one exchange feeding the sort/window
    # (formatted explain prints each node twice: tree line + detail header)
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
    assert n_exchanges == 1, p
