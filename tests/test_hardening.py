"""Regression tests for the round-3 hardening fixes (VERDICT r2 items 6-8):
exact-dedup hash width, ensure_min_partitions shuffle guard, as-of
duplicate-tiebreak determinism, events-stream temp-dir reuse."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from esgopeta_spark.session import ensure_min_partitions, is_scan_stage, read_table
from tests.conftest import SF_SMOKE


def test_exact_dedup_groups_on_wide_hash(spark):
    """The grouping key must be a 256-bit hash (sha2), not a 64-bit one:
    xxhash64 passes 1% collision odds around 6e8 docs — silent merges."""
    from esgopeta_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha  "), (3, "beta"), (4, "gamma")], ["doc_id", "text"]
    )
    plan = exact_dedup(docs)._jdf.queryExecution().analyzed().toString()
    assert "sha2" in plan and "xxhash64" not in plan
    kept = {r["doc_id"] for r in exact_dedup(docs).collect()}
    assert kept == {1, 3, 4}  # 2 normalizes to "alpha" and merges into 1


def test_ensure_min_partitions_skips_shuffled_plans(spark):
    scan = read_table(spark, SF_SMOKE, "nation")
    assert is_scan_stage(scan)
    agg = scan.groupBy("n_regionkey").count()
    assert not is_scan_stage(agg)
    # identity return == the .rdd probe (which would materialize the agg)
    # was never taken
    assert ensure_min_partitions(agg) is agg
    joined = scan.join(read_table(spark, SF_SMOKE, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
    assert ensure_min_partitions(joined) is joined


def test_is_scan_stage_matches_node_tokens_not_substrings(spark):
    """An alias containing an operator name ('Join', 'Sort') must NOT
    false-positive (ADVICE r3): the guard matches line-leading plan node
    tokens, not raw substrings."""
    scan = read_table(spark, SF_SMOKE, "nation").select(
        F.col("n_name").alias("JoinKey"), F.col("n_regionkey").alias("SortOrder")
    )
    assert is_scan_stage(scan), "aliases named like operators false-positived"


def test_is_scan_stage_catches_setop_and_expand_nodes(spark):
    """Intersect/Except/Expand produce shuffles/exchanges too; they must
    disable the .rdd partition probe (ADVICE r3 false-negative list)."""
    a = read_table(spark, SF_SMOKE, "nation").select("n_regionkey")
    b = read_table(spark, SF_SMOKE, "region").select(F.col("r_regionkey").alias("n_regionkey"))
    assert not is_scan_stage(a.intersect(b))
    assert not is_scan_stage(a.exceptAll(b))
    cube = read_table(spark, SF_SMOKE, "nation").cube("n_regionkey").count()
    assert not is_scan_stage(cube)


def test_asof_join_deterministic_under_duplicate_right_ts(spark):
    """Two right rows at the same (key, ts) must carry the GREATEST value
    struct, not an arbitrary partition-order winner."""
    from esgopeta_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100.0, "L")], ["k", "ts", "tag"])
    # duplicates at ts=50 in both insertion orders across many partitions
    right_rows = [(1, 50.0, "aaa"), (1, 50.0, "zzz"), (1, 10.0, "old")]
    for attempt in range(3):
        right = spark.createDataFrame(right_rows, ["k", "ts", "v"]).repartition(8)
        out = asof_join(left, right, key="k", left_ts="ts", right_ts="ts", right_value_cols=["v"])
        assert [r["v"] for r in out.collect()] == ["zzz"], f"attempt {attempt}"
        right_rows = list(reversed(right_rows))


def test_events_stream_temp_dir_reused(spark):
    from esgopeta_spark.streaming.ingest import read_events_stream

    pattern = os.path.join(tempfile.gettempdir(), "esgopeta_events_stream_*")
    read_events_stream(spark, SF_SMOKE)
    count_after_first = len(glob.glob(pattern))
    read_events_stream(spark, SF_SMOKE)
    read_events_stream(spark, SF_SMOKE)
    assert len(glob.glob(pattern)) == count_after_first  # no new dirs per call


def test_parallelism_invariance_of_iterative_ops(spark, sf_dir):
    """The 1000-executor claim, tested locally: the engine's determinism
    guarantees are ORDER-FREE integer/decimal reductions, so the riskiest
    iterative operators must return bit-identical results when the input
    arrives as 1 partition vs 32.  A failure here means some reduction
    silently depends on partition order (float sums, first() without
    ordering) and would flake on a real cluster."""
    from esgopeta_spark.operators.graph_analytics import pagerank
    from esgopeta_spark.operators.similarity import semantic_dedup
    from esgopeta_spark.session import read_table

    emb = read_table(spark, sf_dir, "embeddings")

    def run_sem(df):
        return {
            tuple(r) for r in semantic_dedup(
                df, dim=64, threshold_micro=400000, init_stride=25, n_iter=1
            ).collect()
        }

    assert run_sem(emb.repartition(1)) == run_sem(emb.repartition(32))

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey").distinct()
        .selectExpr("concat('c', o_custkey) as src", "concat('s', l_suppkey) as dst")
    )

    def run_pr(df):
        return {(r["node"], r["rank_micro"]) for r in pagerank(df, iterations=3).collect()}

    assert run_pr(edges.repartition(1)) == run_pr(edges.repartition(32))
