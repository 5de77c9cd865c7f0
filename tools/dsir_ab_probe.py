"""A/B: does materializing the shared bigram-bucket relation cut
dsir_scores wall time?  The λ branch and the scoring branch both consume
`hashed_bigram_counts(raw)`; identical subplans SHOULD hit Spark's
ReuseExchange, but the broadcast boundary between them can defeat it
(the minhash lesson — banded_signatures needed a localCheckpoint).
House protocol: noop-sink materialization, best-of-3, idle gate.
Usage: python tools/dsir_ab_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_for_idle_box  # noqa: E402
from esgopeta_spark.session import get_spark, read_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.selection import (
        dsir_scores,
        dsir_scores_with_lambda,
        dsir_lambda,
        hashed_bigram_counts,
    )

    load, canary, mem_bw, cont = wait_for_idle_box()
    spark = get_spark("dsir-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, SF, "documents")
    target = docs.filter(F.col("lang") == "en")

    def timeit(mk):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mk().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    a = timeit(lambda: dsir_scores(docs, target))

    def b_variant():
        # materialize docb once; derive q (inside a modified lambda) and
        # the scoring join from the checkpointed frame
        docb = hashed_bigram_counts(docs).localCheckpoint()
        q = docb.groupBy("bucket").agg(F.sum("c").alias("qc"))
        # reuse dsir internals by rebuilding lambda from this q: cheapest
        # honest approximation — call dsir_lambda (which recomputes raw
        # docb for q) is NOT the variant; instead score against the
        # trained lambda where training consumed the checkpointed docb.
        from esgopeta_spark.operators.selection import (
            with_milli_log2,
        )

        p = hashed_bigram_counts(target).groupBy("bucket").agg(F.sum("c").alias("pc"))
        qtot = q.agg((F.sum("qc") + F.lit(1024)).cast("bigint").alias("v"))
        ptot = p.agg((F.sum("pc") + F.lit(1024)).cast("bigint").alias("v"))
        ml_q = with_milli_log2(q.select("bucket", (F.col("qc") + 1).cast("bigint").alias("v")), "v", "ml").select("bucket", F.col("ml").alias("ml_q"))
        ml_p = with_milli_log2(p.select("bucket", (F.col("pc") + 1).cast("bigint").alias("v")), "v", "ml").select("bucket", F.col("ml").alias("ml_p"))
        ml_qt = with_milli_log2(qtot, "v", "ml").select(F.col("ml").alias("ml_qtot"))
        ml_pt = with_milli_log2(ptot, "v", "ml").select(F.col("ml").alias("ml_ptot"))
        lam = (
            ml_q.join(ml_p, "bucket", "left")
            .crossJoin(F.broadcast(ml_qt))
            .crossJoin(F.broadcast(ml_pt))
            .select(
                "bucket",
                ((F.coalesce(F.col("ml_p"), F.lit(0)) - F.col("ml_ptot"))
                 - (F.col("ml_q") - F.col("ml_qtot"))).cast("bigint").alias("lam_milli"),
            )
        )
        return (
            docb.join(F.broadcast(lam), "bucket")
            .groupBy("_id")
            .agg(F.sum("c").cast("bigint").alias("n_grams"),
                 F.sum(F.col("c") * F.col("lam_milli")).cast("bigint").alias("score_milli"))
            .select(F.col("_id").alias("doc_id"), "n_grams", "score_milli")
        )

    b = timeit(b_variant)
    print(json.dumps({"loadavg": round(load, 2), "canary_ms": canary,
                      "contaminated": cont, "sf": SF,
                      "a_current_s": a, "b_checkpointed_s": b,
                      "speedup": round(a / b, 2) if b else None}))
    spark.stop()


if __name__ == "__main__":
    main()
