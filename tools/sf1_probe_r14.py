"""sf1* two-decade growth fits for the five remaining >= 3 s
headliners (r14, r13 verdict #6): mine_bitext_margin_ivf,
dedup_audio_fingerprint, sim_topk_cosine_ivf,
graph_pagerank_transactions, graph_communities_lpa.

Protocol = tools/sf1_probe.py doctrine: every scale re-laid-out to the
same 32-file layout (the driver's single-row-group parquet otherwise
measures a serial-scan artifact, not growth), noop-sink
materialization (count() under-measures — Catalyst prunes), best-of-N,
idle gate from bench.py.

Per-family sf1* synthesis (disjoint 10x tiles, structure preserved):

- documents (audio fingerprint): the sf1_probe word~k tiling — the
  audio entry derives per-doc tone classes from doc_id, so tiling
  extends every residue class proportionally.
- embeddings (both IVF tiers): 10 copies with vec_id += k*n (n even,
  so the src/tgt parity split and the %25 centroid spine replicate
  per copy) and one dimension additively perturbed per copy so
  cross-copy exact duplicates don't degenerate the top-k ordering;
  cells scale 10x with per-cell occupancy preserved — the IVF design
  point.
- orders+lineitem (pagerank / LPA): 10 copies with every key column
  offset by k*(max+1) — ten disjoint transaction graphs, so edge and
  node volume scale 10x with degree structure EXACTLY preserved.

Usage: python tools/sf1_probe_r14.py [entry ...]
(writes /tmp/sfsynth14-*/, prints one JSON line)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_for_idle_box  # noqa: E402
from esgopeta_spark.plans import REGISTRY  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402

ENTRIES = sys.argv[1:] or [
    "mine_bitext_margin_ivf",
    "sim_topk_cosine_ivf",
    "dedup_audio_fingerprint",
    "graph_pagerank_transactions",
    "graph_communities_lpa",
]
#: entry -> tables it reads (synthesized per scale)
TABLES = {
    "mine_bitext_margin_ivf": ["embeddings"],
    "sim_topk_cosine_ivf": ["embeddings"],
    "dedup_audio_fingerprint": ["documents"],
    "graph_pagerank_transactions": ["orders", "lineitem"],
    "graph_communities_lpa": ["lineitem"],
}
BASE = "/tmp/sfsynth14"
N_TILES = 10
REPEATS = 2


def _write(df, path):
    df.repartition(32).write.mode("overwrite").parquet(path)


def build_scales(spark, tables) -> dict[str, str]:
    from pyspark.sql import functions as F

    dirs = {}
    for label, src in [("sf0.01", "/root/testdata/sf0.01"),
                       ("sf0.1", "/root/testdata/sf0.1")]:
        out = f"{BASE}-{label}"
        for t in tables:
            p = f"{out}/{t}.parquet"
            if not os.path.exists(p):
                _write(spark.read.parquet(f"{src}/{t}.parquet"), p)
        dirs[label] = out
    out = f"{BASE}-1"
    src = "/root/testdata/sf0.1"
    for t in tables:
        p = f"{out}/{t}.parquet"
        if os.path.exists(p):
            continue
        base = spark.read.parquet(f"{src}/{t}.parquet")
        n = base.count()
        if t == "documents":
            tiles = [
                base.select(
                    (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                    F.regexp_replace(
                        "text", r"(\S+)", r"$1~" + str(k)).alias("text"),
                    "lang", "source", "n_chars",
                )
                for k in range(N_TILES)
            ]
        elif t == "embeddings":
            def emb_tile(k):
                # bind k in this scope (the (value, index) HOF lambda
                # pitfall: never k=k default args)
                kd = k % 7
                eps = 0.0003 * k
                return base.select(
                    (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: x + F.when(
                            i % 7 == F.lit(kd), F.lit(eps)
                        ).otherwise(F.lit(0.0)),
                    ).cast("array<float>").alias("embedding"),
                    "label",
                )
            tiles = [emb_tile(k) for k in range(N_TILES)]
        elif t == "orders":
            mo = base.agg(F.max("o_orderkey")).collect()[0][0] + 1
            mc = base.agg(F.max("o_custkey")).collect()[0][0] + 1
            tiles = [
                base.select(
                    (F.col("o_orderkey") + F.lit(k * mo)).alias("o_orderkey"),
                    (F.col("o_custkey") + F.lit(k * mc)).alias("o_custkey"),
                    "o_orderstatus", "o_totalprice", "o_orderdate",
                    "o_orderpriority",
                )
                for k in range(N_TILES)
            ]
        elif t == "lineitem":
            # the SAME o_orderkey offset as orders so the join keys of
            # each tile stay aligned
            mo = (spark.read.parquet(f"{src}/orders.parquet")
                  .agg(F.max("o_orderkey")).collect()[0][0] + 1)
            mp = base.agg(F.max("l_partkey")).collect()[0][0] + 1
            ms = base.agg(F.max("l_suppkey")).collect()[0][0] + 1
            keep = [c for c in base.columns
                    if c not in ("l_orderkey", "l_partkey", "l_suppkey")]
            tiles = [
                base.select(
                    (F.col("l_orderkey") + F.lit(k * mo)).alias("l_orderkey"),
                    (F.col("l_partkey") + F.lit(k * mp)).alias("l_partkey"),
                    (F.col("l_suppkey") + F.lit(k * ms)).alias("l_suppkey"),
                    *keep,
                )
                for k in range(N_TILES)
            ]
        else:
            raise ValueError(t)
        df = tiles[0]
        for x in tiles[1:]:
            df = df.unionByName(x)
        _write(df, p)
    dirs["sf1*"] = out
    return dirs


def main() -> None:
    load, canary, mem_bw, contaminated = wait_for_idle_box()
    spark = get_spark("sf1-probe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    need = sorted({t for e in ENTRIES for t in TABLES[e]})
    dirs = build_scales(spark, need)
    out = {"loadavg": round(load, 2), "canary_ms": canary,
           "membw_ms": mem_bw, "contaminated": contaminated,
           "layout": "32 files per scale", "entries": {}}
    for name in ENTRIES:
        fn = REGISTRY[name].fn
        times = {}
        for label, d in dirs.items():
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                fn(spark, d).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            times[label] = round(best, 2)
        xs = [math.log(v) for v in (1.0, 10.0, 100.0)]
        ys = [math.log(times[k]) for k in ("sf0.01", "sf0.1", "sf1*")]
        mx, my = sum(xs) / 3, sum(ys) / 3
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs)
        times["exponent"] = round(slope, 2)
        out["entries"][name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
