"""Stage probe #2 for decontaminate_minhash_fuzzy: constructions with
eager checkpoints must be timed INSIDE the attempt (bench.py times
fn(spark, sf_dir) + noop together)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from esgopeta_spark.session import get_spark


def t(label, mk, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        spark = mk.__globals__.get("spark")
    print(f"{label:50s} {best:7.3f} s", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-decontam2")
    spark.sparkContext.setLogLevel("ERROR")
    from esgopeta_spark.plans import REGISTRY

    fn = REGISTRY["decontaminate_minhash_fuzzy"].fn
    # warmup
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    def full():
        return fn(spark, sf_dir)

    t("FULL entry (construction + noop)", full)
    spark.catalog.clearCache()

    # sub-stages, constructed fresh per attempt
    from esgopeta_spark.operators.dedup import (
        decontaminate_minhash,
        portable_minhash_bands,
    )
    from esgopeta_spark.session import ensure_min_partitions, read_table

    def corpus_ev():
        d = ensure_min_partitions(read_table(spark, sf_dir, "documents"))
        tc = F.coalesce(F.col("text"), F.lit(""))
        ev = d.filter(F.col("source") == "src19").select("doc_id", tc.alias("text"))
        leaks = ev.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" leaked into training")).alias("text"),
        )
        corpus = (
            d.filter(F.col("source") != "src19")
            .select("doc_id", tc.alias("text"))
            .unionByName(leaks)
        )
        return corpus, ev

    t("corpus construction + noop", lambda: corpus_ev()[0])
    t("corpus bands (incl. eager cp)", lambda: portable_minhash_bands(corpus_ev()[0], "text", "doc_id", 16, 4, 3))
    t("eval bands", lambda: portable_minhash_bands(corpus_ev()[1], "text", "doc_id", 16, 4, 3))

    def cands_only():
        corpus, ev = corpus_ev()
        cb = portable_minhash_bands(corpus, "text", "doc_id", 16, 4, 3).localCheckpoint()
        eb = portable_minhash_bands(ev, "text", "doc_id", 16, 4, 3)
        return (
            cb.alias("c")
            .join(F.broadcast(eb.alias("e")),
                  (F.col("c.band") == F.col("e.band")) & (F.col("c.bh") == F.col("e.bh")))
            .select(F.col("c._id").alias("corpus_id"), F.col("e._id").alias("eval_id"))
            .distinct()
        )

    t("through candidate join", cands_only)
    t("full decontaminate_minhash", lambda: decontaminate_minhash(*corpus_ev()))
    spark.stop()


if __name__ == "__main__":
    main()
