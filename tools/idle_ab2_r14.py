"""Idle-gated interleaved A/B: the r14 scan-widening of
web_redirect_resolve / pipeline_crawl_frontier (old shape vs new shape
in ONE session, alternating rounds — the CLAUDE.md adjudication
discipline), plus clean re-probes of the codec entries and a deeper
q1 widen A/B.
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


def attempt(fn):
    j0, s0 = _total_busy_jiffies(), _subtree_jiffies()
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    ext = max(0, (_total_busy_jiffies() - j0) - (_subtree_jiffies() - s0)) / _HZ
    return dt, ext


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    load, canary, membw, timed_out = wait_for_idle_box()
    print(f"# gate: loadavg {load:.2f} canary {canary:.2f} membw {membw:.2f} "
          f"timeout={timed_out}", flush=True)
    spark = get_spark("esgopeta-idle-ab2")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from esgopeta_spark.operators.web import (
        collapse_redirects,
        robots_filter,
        sitemap_entries,
        synth_frontier_redirect_warc,
        synth_redirect_warc,
        synth_sitemap,
        url_canonicalize,
        warc_redirect_edges,
    )
    from esgopeta_spark.plans.catalog import T
    from esgopeta_spark.plans.catalog_web import _ROBOTS_EVEN, _ROBOTS_ODD
    from esgopeta_spark.session import ensure_min_partitions

    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    noop(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))

    def redirect(widen: bool):
        d = T(spark, SF_DIR, "documents").select("doc_id")
        if widen:
            d = ensure_min_partitions(d)
        noop(collapse_redirects(warc_redirect_edges(synth_redirect_warc(d))))

    def crawl(widen: bool):
        did = F.col("doc_id")
        base = T(spark, SF_DIR, "documents").select("doc_id")
        if widen:
            base = ensure_min_partitions(base)
        d = base.select("doc_id", synth_sitemap(did).alias("sitemap_xml"))
        urls = (
            sitemap_entries(d)
            .select("doc_id", F.explode("entries").alias("ent"))
            .filter(F.col("ent.kind") == "url")
            .select("doc_id", F.col("ent.loc").alias("url"))
        )
        heads = T(spark, SF_DIR, "documents").filter(did % 10 == 3).select("doc_id")
        if widen:
            heads = ensure_min_partitions(heads)
        rmap = (
            collapse_redirects(warc_redirect_edges(synth_frontier_redirect_warc(heads)))
            .filter(F.col("resolved") == 1)
            .select(F.col("src_url").alias("_redir_src"),
                    F.col("final_url").alias("_redir_final"))
        )
        canon = url_canonicalize(urls)
        eff = (
            canon.join(rmap, canon["url_canon"] == rmap["_redir_src"], "left")
            .select("doc_id",
                    F.coalesce("_redir_final", "url_canon").alias("url_canon"))
        )
        u = eff.select(
            "doc_id", "url_canon",
            F.regexp_extract("url_canon", r"^[a-z]+://([^/]+)", 1).alias("host"),
            F.regexp_extract("url_canon", r"^[a-z]+://[^/]+([^?#]*)", 1).alias("path"),
            F.when((F.col("doc_id") % 40) % 2 == 0, F.lit(_ROBOTS_EVEN))
            .otherwise(F.lit(_ROBOTS_ODD)).alias("robots"),
        )
        allowed = (
            robots_filter(u)
            .filter(F.col("allowed") == 1)
            .select("doc_id", "host", "url_canon")
        )
        win = Window.partitionBy("host").orderBy(
            F.col("url_canon").asc(), F.col("doc_id").asc()
        )
        rn = F.row_number().over(win) - 1
        noop(allowed.select(
            "doc_id", "host", "url_canon",
            (rn / 4).cast("bigint").alias("fetch_wave"),
            (rn % 4).cast("int").alias("slot"),
        ))

    out: dict = {}
    for rnd in range(3):
        for key, fn in [("redirect_old", lambda: redirect(False)),
                        ("redirect_new", lambda: redirect(True)),
                        ("crawl_old", lambda: crawl(False)),
                        ("crawl_new", lambda: crawl(True))]:
            dt, ext = attempt(fn)
            out.setdefault(key, []).append((round(dt, 3), round(ext, 2)))
            print(f"r{rnd} {key}: {dt:.3f}s ext={ext:.2f}", flush=True)
            spark.catalog.clearCache()

    # q1 widen A/B, 5 alternating attempts each
    def q1_asis():
        noop(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))

    def q1_wide():
        from esgopeta_spark.plans.catalog import money, pct
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

    for rnd in range(5):
        for key, fn in [("q1_asis", q1_asis), ("q1_wide", q1_wide)]:
            dt, ext = attempt(fn)
            out.setdefault(key, []).append((round(dt, 3), round(ext, 2)))
            print(f"r{rnd} {key}: {dt:.3f}s ext={ext:.2f}", flush=True)

    # clean re-probes of the codec entries (best-of-3 x 2 rounds)
    for name in ["dedup_audio_fingerprint", "multimodal_decode_mp3_audio",
                 "multimodal_decode_mpeg1_video"]:
        for rnd in range(3):
            dt, ext = attempt(lambda: noop(REGISTRY[name].fn(spark, SF_DIR)))
            out.setdefault(name, []).append((round(dt, 3), round(ext, 2)))
            print(f"r{rnd} {name}: {dt:.3f}s ext={ext:.2f}", flush=True)
            spark.catalog.clearCache()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
