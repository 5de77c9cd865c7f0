"""Fixed-increment growth probe for the snapshot-incremental dedup
(r12, verdict #7 second half): the O(increment) claim says the nightly
loop's work rides the INCREMENT, not the accumulated corpus.  The
three-point sf1* fit (tools/sf1_probe.py pipeline_incremental_snapshot)
scales prior AND increment together; this probe holds the increment
FIXED (the sf0.01 increment slice, re-keyed) while the PRIOR corpus
grows sf0.01 -> sf0.1 -> sf1* (the 10x-tiled synth, same 32-file
layout discipline as sf1_probe), timing ``incremental_dedup`` alone
with the house protocol (noop sink, best-of-N, idle gate).

What linear-in-prior cost remains is the keeper-store BUILD (one
normalize+groupBy scan of prior — in production the store is persisted
and this term vanishes); the increment-side work (store probe,
within-increment window, verdict join) is constant here by
construction.  The probe prints both the raw fit and the store-build
share so the adjudication is visible.

Usage: python tools/incr_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_for_idle_box  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402
from tools.sf1_probe import build_scales  # noqa: E402

REPEATS = 2


def main() -> None:
    load, canary, mem_bw, contaminated = wait_for_idle_box()
    spark = get_spark("incr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.dedup import incremental_dedup

    dirs = build_scales(spark)
    # the FIXED increment: the sf0.01 table re-keyed out of every
    # scale's id range, half the docs marked genuinely new
    incr = (
        spark.read.parquet(dirs["sf0.01"] + "/documents.parquet")
        .select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.coalesce(F.col("text"), F.lit("")),
                         F.lit(" fresh increment")),
            ).otherwise(F.coalesce(F.col("text"), F.lit(""))).alias("text"),
        )
        .localCheckpoint()
    )
    out = {"loadavg": round(load, 2), "canary_ms": canary,
           "contaminated": contaminated,
           "increment_docs": incr.count(), "priors": {}, "times": {}}
    for label, d in dirs.items():
        prior = spark.read.parquet(d + "/documents.parquet").select(
            "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
        )
        out["priors"][label] = prior.count()
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            incremental_dedup(prior, incr).write.mode("overwrite").format(
                "noop").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        # store-build share: time the prior-side hash+groupBy alone
        # (the exact prior_keep relation incremental_dedup derives)
        from esgopeta_spark.operators.dedup import normalize_text

        t0 = time.perf_counter()
        (prior.select(
            F.sha2(normalize_text(F.col("text")), 256).alias("_th"), "doc_id")
         .groupBy("_th").agg(F.min("doc_id").alias("pk"))
         .write.mode("overwrite").format("noop").save())
        store_t = time.perf_counter() - t0
        out["times"][label] = {"total": round(best, 2),
                               "store_build": round(store_t, 2)}
    xs = [math.log(out["priors"][k]) for k in dirs]
    ys = [math.log(out["times"][k]["total"]) for k in dirs]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    out["exponent_vs_prior"] = round(
        sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        / sum((x - mx) ** 2 for x in xs), 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
