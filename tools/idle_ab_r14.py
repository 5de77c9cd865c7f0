"""Idle-gated A/B batch for the r14 optimization round.

Waits for the bench.py start gate (both canaries + loadavg), then times:
  - the touched entries (audio/mp3/video codecs, NB, PSI, crawl, redirect)
  - q1/q3/q5/q10 as-registered vs a widened-scan variant (guide §2.5)
  - pagerank: edges-construction-only vs the full entry

Each attempt carries the bench external-CPU meter so contamination is
visible per number.  Noop-sink materialization throughout (guide §1.4).

Usage: python tools/idle_ab_r14.py [--skip-entries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _HZ, _subtree_jiffies, _total_busy_jiffies, wait_for_idle_box  # noqa: E402
from esgopeta_spark.plans import REGISTRY  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn, n=3):
    best = (float("inf"), 0.0)
    for _ in range(n):
        j0, s0 = _total_busy_jiffies(), _subtree_jiffies()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        ext = max(0, (_total_busy_jiffies() - j0) - (_subtree_jiffies() - s0)) / _HZ
        if dt < best[0]:
            best = (dt, ext)
    return best


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    load, canary, membw, timed_out = wait_for_idle_box()
    print(f"# gate: loadavg {load:.2f} canary {canary:.2f} membw {membw:.2f} "
          f"timeout={timed_out}", flush=True)
    spark = get_spark("esgopeta-idle-ab")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from esgopeta_spark.plans.catalog import T, money, pct
    from esgopeta_spark.session import ensure_min_partitions

    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    noop(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))

    out = {}

    if "--skip-entries" not in sys.argv:
        for name in [
            "dedup_audio_fingerprint", "multimodal_decode_mp3_audio",
            "multimodal_decode_mpeg1_video", "select_nb_langid",
            "corpus_drift_psi", "pipeline_crawl_frontier",
            "web_redirect_resolve", "graph_pagerank_transactions",
            "web_zstd_house_encode",
        ]:
            dt, ext = timed(lambda: noop(REGISTRY[name].fn(spark, SF_DIR)))
            out[name] = (round(dt, 3), round(ext, 2))
            print(f"{name}: {dt:.3f}s ext={ext:.2f}", flush=True)
            spark.catalog.clearCache()

    # --- TPC-H widened variants -------------------------------------------
    def q1_wide():
        li = ensure_min_partitions(
            T(spark, SF_DIR, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
        )
        disc_price = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
        charge = disc_price * (F.lit(1) + pct("l_tax"))
        noop(li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(pct("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        ))

    for name in ["q1_pricing_summary", "q3_shipping_priority",
                 "q5_local_supplier_volume", "q10_returned_items"]:
        dt, ext = timed(lambda: noop(REGISTRY[name].fn(spark, SF_DIR)))
        out[name] = (round(dt, 3), round(ext, 2))
        print(f"{name} (as-is): {dt:.3f}s ext={ext:.2f}", flush=True)
    dt, ext = timed(q1_wide)
    out["q1_widened"] = (round(dt, 3), round(ext, 2))
    print(f"q1_widened: {dt:.3f}s ext={ext:.2f}", flush=True)

    # --- pagerank decomposition -------------------------------------------
    def pr_edges_only():
        o = T(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
        li = T(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
        edges = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .select("o_custkey", "l_suppkey").distinct()
            .select(
                F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            )
        )
        noop(edges)

    dt, ext = timed(pr_edges_only)
    out["pagerank_edges_only"] = (round(dt, 3), round(ext, 2))
    print(f"pagerank_edges_only: {dt:.3f}s ext={ext:.2f}", flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
