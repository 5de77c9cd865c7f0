"""Trained text classification for corpus curation (SURVEY.md §2 G4
family): multinomial Naive Bayes over hashed unigram features — the
shape of the trained-classifier stages real pretraining pipelines run
(CCNet §3's fastText language-ID gate, Wenzek et al. 2020; the
fineweb-edu / DCLM quality classifiers), re-expressed Spark-first.

The model is two bounded tables:

  model: (label, bucket, lw_milli)   lw = mlog2(n_{c,b} + 1), ≤ C·B rows
  cls:   (label, prior_milli, denom_milli)
         prior = mlog2(D_c) − mlog2(D),  denom = mlog2(N_c + B)

and the add-1-smoothed NB posterior (∝, in milli-log2 units) is

  score(d, c) = prior_c + Σ_b c_{d,b}·lw_{c,b} − T_d·denom_c

— pure int64 throughout.  Transcendental ln never crosses the engine
boundary (the catalog determinism rules): every log term is the
engine-exact integer shift-and-square milli-log2 from
operators/selection.py, so the DuckDB oracle runs the IDENTICAL
recurrence and the catalog entries hash-exactly.  log2 ∝ ln, so the NB
argmax is preserved up to the documented ~2.5-milli floor quantization
(ties broken deterministically by smallest label, both engines).

Scale shape: training is one token stream (posexplode, no HOF folds)
into a (label, bucket) groupBy bounded by C·B, whose ≤C·B-row result is
collected ONCE and turned into the two model tables with the pure-int
milli-log2 twin (bounded driver state — the codebook doctrine; the
corpus-sized scans stay distributed); scoring broadcasts the model into
the per-doc bucket counts (one doc-keyed groupBy) and takes the per-doc
argmax with one doc-keyed window — the same shuffle key, so AQE reuses
the exchange.  Nothing all-pairs; C (labels) and B (buckets) are
bounded by construction, so the collect and the broadcast hold at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

from esgopeta_spark.operators.selection import hash_bucket
from esgopeta_spark.operators.text import words


def nb_train(
    train: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """Train the NB model: returns ``(model, cls)`` as documented in the
    module docstring.  One token scan; every aggregate lands on ≤ C·B
    rows, so both outputs are broadcast-sized artifacts a scorer (batch
    or streaming) ships to executors."""
    tok = train.select(
        F.col(label_col).alias("label"),
        F.explode(words(F.col(text_col))).alias("w"),
    )
    ncb = (
        tok.select("label", hash_bucket(F.col("w"), buckets).alias("bucket"))
        .groupBy("label", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # r14 (optimization): the model tail is BOUNDED at <= C*B rows by
    # construction at ANY corpus size — the honest bounded-driver-state
    # pattern (assign_cells / dsir_lambda; the streaming scorer already
    # collects these very tables).  Collect the token aggregate and the
    # per-label doc counts ONCE and run every milli-log2 recurrence in
    # pure int Python (``milli_log2_int``, pinned bit-equal to the
    # engine expression chain and the DuckDB CTE in tests).  The
    # previous all-engine tail built FOUR 10-step shift-and-square
    # projection chains plus joins over the bounded frames, and — the
    # real cost — the model and cls broadcasts each re-ran the
    # corpus-sized token scan (ReuseExchange does not bridge separate
    # broadcast jobs).  The distributed token scan now runs exactly
    # once; the doc-count aggregate is a second cheap label-only pass.
    from esgopeta_spark.operators.selection import milli_log2_int

    ncb_rows = [
        (r["label"], int(r["bucket"]), int(r["n"])) for r in ncb.collect()
    ]
    dc_rows = {
        r["label"]: int(r["v"])
        for r in train.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
        .collect()
    }
    ml_dtot = milli_log2_int(sum(dc_rows.values()))
    n_c: dict = {}
    for lab, _b, n in ncb_rows:
        n_c[lab] = n_c.get(lab, 0) + n
    skey = lambda x: (x is None, x)  # noqa: E731 — stable order w/ null label
    model_rows = [
        (lab, b, milli_log2_int(n + 1))
        for lab, b, n in sorted(ncb_rows, key=lambda t: (skey(t[0]), t[1]))
    ]
    # cls mirrors the previous inner join on label: a label present in
    # the doc counts but absent from the token stream (all-empty docs)
    # stays out, exactly as before.
    cls_rows = [
        (
            lab,
            milli_log2_int(dc_rows[lab]) - ml_dtot,
            milli_log2_int(n_c[lab] + buckets),
        )
        for lab in sorted(dc_rows, key=skey)
        if lab in n_c
    ]
    ltype = train.schema[label_col].dataType
    model = train.sparkSession.createDataFrame(
        model_rows,
        StructType(
            [
                StructField("label", ltype),
                StructField("bucket", LongType()),
                StructField("lw_milli", LongType()),
            ]
        ),
    )
    cls = train.sparkSession.createDataFrame(
        cls_rows,
        StructType(
            [
                StructField("label", ltype),
                StructField("prior_milli", LongType()),
                StructField("denom_milli", LongType()),
            ]
        ),
    )
    return model, cls


def nb_scores(
    docs: DataFrame,
    model: DataFrame,
    cls: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Per-(doc, label) NB scores: (id, label, n_tokens, score_milli).
    Every doc gets a row for every trained label (a doc sharing no
    bucket with a class still scores prior − T·denom: absent model
    buckets carry lw = mlog2(0+1) = 0 exactly, so the left join is the
    smoothed value, not an approximation)."""
    docb = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(words(F.col(text_col))).alias("w"),
        )
        .select("_id", hash_bucket(F.col("w"), buckets).alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sums = (
        docb.join(F.broadcast(model), "bucket")
        .groupBy("_id", "label")
        .agg(F.sum(F.col("c") * F.col("lw_milli")).cast("bigint").alias("s"))
    )
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.size(words(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    return (
        base.crossJoin(F.broadcast(cls))
        .join(sums, ["_id", "label"], "left")
        .select(
            "_id",
            "label",
            "n_tokens",
            (
                F.col("prior_milli")
                + F.coalesce(F.col("s"), F.lit(0))
                - F.col("n_tokens") * F.col("denom_milli")
            ).cast("bigint").alias("score_milli"),
        )
    )


def nb_predict(
    docs: DataFrame,
    model: DataFrame,
    cls: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Per-doc argmax prediction: (id, pred_label, score_milli,
    n_tokens).  Deterministic total order per doc: score DESC, label
    ASC (catalog rule 4) — both engines break milli-quantization ties
    identically."""
    s = nb_scores(docs, model, cls, text_col, id_col, buckets)
    win = Window.partitionBy("_id").orderBy(
        F.col("score_milli").desc(), F.col("label").asc()
    )
    return (
        s.select("*", F.row_number().over(win).alias("_rn"))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("label").alias("pred_label"),
            "score_milli",
            "n_tokens",
        )
    )
