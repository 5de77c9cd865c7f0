"""sf1 growth probe for the LINEAR (data-proportional) span family
(r9, verdict #8): /root/testdata tops out at sf0.1 and is read-only, so
this synthesizes an sf1-EQUIVALENT documents table and times the three
span entries at sf0.01 / sf0.1 / synth-sf1 with the house protocol
(noop-sink materialization, best-of-N, idle gate), printing a
three-point log-log fit of time vs corpus words.

Two pitfalls this probe's earlier drafts hit, kept here as doctrine:

1. LAYOUT, not data, dominated the naive comparison.  The driver's
   sf0.1/documents.parquet is ONE file with ONE row group (5000 rows),
   so Spark runs the scan + posexplode gram stream on a SINGLE task —
   the serial stage, not the gram volume, set the sf0.1 time, and a
   32-file synth at 10x the words measured FASTER than sf0.1.  The
   probe therefore re-lays-out every scale to the same 32-file layout
   before timing (at 100 TB inputs arrive in thousands of row groups;
   the single-row-group serial scan is a small-file artifact).

2. Synthesis must reproduce the duplicated-gram STRUCTURE, not just a
   density number.  A pure word-salad synth has ~0% duplicate grams
   (measures only the scan); a planted-pool synth matched the real
   4.7% duplicated-gram density but not the group-size layout.  The
   fix: tile the REAL sf0.1 corpus 10x, rewriting every word with a
   per-copy suffix (word -> word~k), so each copy is the real corpus
   verbatim in a disjoint vocabulary — gram-group structure is EXACTLY
   real, replicated 10x, with zero cross-copy matches by construction.

Usage: python tools/sf1_probe.py [entry ...]
(writes /tmp/sfsynth-*/, prints JSON; default entries = the span
family; r10 runs it for the gram-stream family too —
select_dsir_scores, text_entropy_kl_profile, text_bm25_retrieval)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import cpu_canary_ms, wait_for_idle_box  # noqa: E402
from esgopeta_spark.plans import REGISTRY  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402

ENTRIES = sys.argv[1:] or [
    "dedup_substring_spans", "dedup_span_extract", "dedup_span_removal"
]
BASE = "/tmp/sfsynth"
N_TILES = 10  # sf0.1 x 10 = sf1-equivalent
REPEATS = 2


def build_scales(spark) -> dict[str, str]:
    """Write layout-normalized (32-file) copies of sf0.01 / sf0.1 and the
    10x-tiled sf1* table; returns label -> dir."""
    from pyspark.sql import functions as F

    dirs = {}
    for label, src in [("sf0.01", "/root/testdata/sf0.01"),
                       ("sf0.1", "/root/testdata/sf0.1")]:
        out = f"{BASE}-{label}"
        if not os.path.exists(out + "/documents.parquet"):
            (spark.read.parquet(src + "/documents.parquet")
             .repartition(32).write.mode("overwrite")
             .parquet(out + "/documents.parquet"))
        dirs[label] = out
    out = f"{BASE}-1"
    if not os.path.exists(out + "/documents.parquet"):
        src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n = src.count()
        tiles = [
            src.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", r"$1~" + str(k)).alias("text"),
                "lang", "source", "n_chars",
            )
            for k in range(N_TILES)
        ]
        df = tiles[0]
        for t in tiles[1:]:
            df = df.unionByName(t)
        df.repartition(32).write.mode("overwrite").parquet(out + "/documents.parquet")
    dirs["sf1*"] = out
    return dirs


def main() -> None:
    load, canary, mem_bw, contaminated = wait_for_idle_box()
    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = build_scales(spark)
    from pyspark.sql import functions as F

    words = {
        label: (
            spark.read.parquet(d + "/documents.parquet")
            .select(F.sum(F.size(F.split("text", " "))).alias("w"))
            .collect()[0]["w"]
        )
        for label, d in dirs.items()
    }
    out = {"loadavg": round(load, 2), "canary_ms": canary,
           "contaminated": contaminated, "layout": "32 files per scale",
           "words": words, "entries": {}}
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
        # least-squares slope of log(t) vs log(words) over the 3 points
        xs = [math.log(words[k]) for k in times]
        ys = [math.log(times[k]) for k in times]
        mx, my = sum(xs) / 3, sum(ys) / 3
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        times["exponent"] = round(slope, 2)
        out["entries"][name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
