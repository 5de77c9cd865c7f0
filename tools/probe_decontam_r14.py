"""Stage-level A/B probe for decontaminate_minhash_fuzzy (r14 opt).

Times each sub-stage of the pipeline with the noop sink (guide §1.4).
Run on an idle box only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esgopeta_spark.operators.dedup import (
    md5_hash32,
    portable_lane_consts,
    portable_minhash_bands,
    shingles,
    PORTABLE_P,
)
from esgopeta_spark.session import ensure_min_partitions, get_spark, read_table


def t(label, df, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best:7.3f} s")
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-decontam")
    spark.sparkContext.setLogLevel("ERROR")

    d = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
    tcol = F.coalesce(F.col("text"), F.lit(""))
    ev = d.filter(F.col("source") == "src19").select("doc_id", tcol.alias("text"))
    leaks = ev.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" leaked into training")).alias("text"),
    )
    corpus = (
        d.filter(F.col("source") != "src19")
        .select("doc_id", tcol.alias("text"))
        .unionByName(leaks)
    )
    corpus = corpus.localCheckpoint()
    ev = ev.localCheckpoint()
    print("corpus rows", corpus.count(), "eval rows", ev.count())

    # warmup
    corpus.write.mode("overwrite").format("noop").save()

    t("corpus scan only", corpus)
    sh = corpus.select("doc_id", shingles(F.col("text"), 3).alias("_sh"))
    t("shingle strings (array)", sh)
    ghs = corpus.select(
        F.col("doc_id").alias("_id"),
        F.transform(shingles(F.col("text"), 3), md5_hash32).alias("_ghs"),
    ).filter(F.size("_ghs") > 0)
    t("gram md5 hashes (array)", ghs)

    ghs_cp = ghs.localCheckpoint()
    A, B = portable_lane_consts(16)

    def _lane(k):
        a, b = F.lit(A[k]), F.lit(B[k])
        return F.array_min(
            F.transform(F.col("_ghs"), lambda g: (a * g + b) % F.lit(PORTABLE_P))
        ).alias(f"_m{k}")

    lanes = ghs_cp.select("_id", *[_lane(k) for k in range(16)])
    t("lane mins from checkpointed ghs (HOF)", lanes)

    bands = portable_minhash_bands(corpus, "text", "doc_id", 16, 4, 3)
    t("full portable bands corpus", bands)
    ebands = portable_minhash_bands(ev, "text", "doc_id", 16, 4, 3)
    t("full portable bands eval", ebands)

    from esgopeta_spark.operators.dedup import decontaminate_minhash

    full = decontaminate_minhash(corpus, ev)
    t("full decontaminate_minhash", full, n=3)

    spark.stop()


if __name__ == "__main__":
    main()
