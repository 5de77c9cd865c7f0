"""Per-ATTEMPT-gated interleaved A/B for the flapping-host regime: the
canary is polled before EVERY attempt (not just at run start), an
attempt only fires inside a momentarily-clean window, and only attempts
whose own ext-CPU meter reads clean are kept.  Alternates variants so
any residual drift hits both sides equally.

Usage: python tools/idle_ab3_r14.py <pairset> [clean_pairs]
  pairset: redirect | crawl | q1 | urlx
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _HZ, _subtree_jiffies, _total_busy_jiffies, cpu_canary_ms  # noqa: E402
from esgopeta_spark.plans import REGISTRY  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MAX_S = 1800


def wait_clean_moment():
    while True:
        c = cpu_canary_ms()
        if c <= 2.5:
            return c
        time.sleep(5)


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
    pairset = sys.argv[1]
    want = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("esgopeta-idle-ab3")
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
        synth_url_variants,
        synth_xrobots_warc,
        url_canonicalize,
        warc_redirect_edges,
        warc_robots_directives,
    )
    from esgopeta_spark.plans.catalog import T, money, pct
    from esgopeta_spark.plans.catalog_web import _ROBOTS_EVEN, _ROBOTS_ODD, _seed_url
    from esgopeta_spark.session import ensure_min_partitions

    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    noop(REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR))

    def redirect(widen):
        def f():
            d = T(spark, SF_DIR, "documents").select("doc_id")
            if widen:
                d = ensure_min_partitions(d)
            noop(collapse_redirects(warc_redirect_edges(synth_redirect_warc(d))))
        return f

    def crawl(widen):
        def f():
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
                collapse_redirects(
                    warc_redirect_edges(synth_frontier_redirect_warc(heads)))
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
                robots_filter(u).filter(F.col("allowed") == 1)
                .select("doc_id", "host", "url_canon")
            )
            w = Window.partitionBy("host").orderBy(
                F.col("url_canon").asc(), F.col("doc_id").asc())
            rn = F.row_number().over(w) - 1
            noop(allowed.select(
                "doc_id", "host", "url_canon",
                (rn / 4).cast("bigint").alias("fetch_wave"),
                (rn % 4).cast("int").alias("slot"),
            ))
        return f

    def q1v(widen):
        def f():
            li = T(spark, SF_DIR, "lineitem").filter(
                F.col("l_shipdate") <= "2000-09-02")
            if widen:
                li = ensure_min_partitions(li)
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
        return f

    def urlx(widen):
        def f():
            base = T(spark, SF_DIR, "documents").select("doc_id")
            if widen:
                base = ensure_min_partitions(base)
            d = base.select(
                "doc_id",
                F.explode(synth_url_variants(F.col("doc_id"))).alias("url"))
            noop(url_canonicalize(d).groupBy("url_canon").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_variants"),
                F.min("doc_id").cast("bigint").alias("doc_id")))
            did = F.col("doc_id")
            b2 = T(spark, SF_DIR, "documents").select("doc_id")
            if widen:
                b2 = ensure_min_partitions(b2)
            d2 = b2.select("doc_id", _seed_url(did).alias("uri"))
            noop(warc_robots_directives(synth_xrobots_warc(d2).drop("uri")))
        return f

    mk = {"redirect": redirect, "crawl": crawl, "q1": q1v, "urlx": urlx}[pairset]
    old_fn, new_fn = mk(False), mk(True)
    clean: dict = {"old": [], "new": []}
    deadline = time.monotonic() + MAX_S
    while (min(len(clean["old"]), len(clean["new"])) < want
           and time.monotonic() < deadline):
        for key, fn in [("old", old_fn), ("new", new_fn)]:
            c = wait_clean_moment()
            dt, ext = attempt(fn)
            ok = ext <= 0.5 * dt
            print(f"{key}: {dt:.3f}s ext={ext:.2f} canary={c:.2f}"
                  f" {'KEEP' if ok else 'drop'}", flush=True)
            if ok:
                clean[key].append(round(dt, 3))
            spark.catalog.clearCache()
    print(json.dumps({k: (min(v) if v else None, v) for k, v in clean.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
