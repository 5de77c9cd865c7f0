"""Targeted data selection for pretraining corpora (SURVEY.md §2 G4
family): DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling", public
NeurIPS paper) — score every raw document by how much its hashed-bigram
profile looks like a TARGET corpus, then keep the top-k.

The paper's importance weight is  log w(doc) = Σ_b c_b · (ln p̂_b − ln q̂_b)
over hashed n-gram buckets b (c_b = the doc's bucket counts, p̂/q̂ the
add-1-smoothed target/raw bucket distributions).  Transcendental ln is
NOT identically rounded across engines (the catalog determinism rules),
so this module computes the log terms with an ENGINE-EXACT integer
milli-log2: normalize the integer operand to Q20 fixed point and run the
classic shift-and-square algorithm (10 squaring steps → 10 fractional
bits) in pure int64 arithmetic — bit-identical in Spark and DuckDB, and
log2 ∝ ln, so the paper's ranking is preserved up to the documented
~2-milli quantization (pinned in tests/test_llm_ops.py).

Scale shape: one lag-window bigram stream per corpus (no self-join), two
bounded groupBys onto ≤``buckets`` rows, the λ table (≤``buckets`` rows)
broadcast into the per-doc bucket counts, one final per-doc groupBy.  No
collect, no cartesian, nothing all-pairs; the only data-proportional
stages are the gram stream and the doc-keyed aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esgopeta_spark.operators.text import words

#: Q20 fixed point: the mantissa lives in [2^20, 2^21).
_FX = 20
#: fractional log2 bits extracted by shift-and-square.
_FRAC_BITS = 10


def with_milli_log2(df: DataFrame, vcol: str, out: str) -> DataFrame:
    """Append ``out`` = milli-log2 of the positive-int64 column ``vcol``,
    computed engine-exactly in integer arithmetic (no libm):

      e = bitlen(v) - 1                       (integer part of log2)
      m = v normalized into [2^20, 2^21)      (Q20 mantissa)
      10× shift-and-square: m←m²>>20, emitting one fractional bit per
      step (≥2^21 ⇒ bit 1, halve), MSB first into f ∈ [0, 1024)
      out = 1000·e + (1000·f) div 1024

    Floor-biased by construction: out ∈ [1000·log2(v) − 2.5, 1000·log2(v)]
    (mantissa truncation + 10-bit fraction floor + milli floor), which the
    tests pin.  The identical integer recurrence is emitted as the DuckDB
    oracle by :func:`milli_log2_sql`."""
    two_fx1 = 1 << (_FX + 1)
    d = df.select(
        "*",
        (F.length(F.expr(f"bin({vcol})")) - 1).cast("bigint").alias("_e"),
        F.expr(
            f"CASE WHEN length(bin({vcol})) - 1 >= {_FX} "
            f"THEN shiftright({vcol}, length(bin({vcol})) - 1 - {_FX}) "
            f"ELSE shiftleft({vcol}, {_FX} - (length(bin({vcol})) - 1)) END"
        ).cast("bigint").alias("_m"),
        F.lit(0).cast("bigint").alias("_f"),
    )
    for _ in range(_FRAC_BITS):
        d = d.select(
            *[c for c in d.columns if c not in ("_m", "_f")],
            F.expr(
                f"CASE WHEN shiftright(_m * _m, {_FX}) >= {two_fx1} "
                f"THEN shiftright(shiftright(_m * _m, {_FX}), 1) "
                f"ELSE shiftright(_m * _m, {_FX}) END"
            ).alias("_m"),
            F.expr(
                f"_f * 2 + CASE WHEN shiftright(_m * _m, {_FX}) >= {two_fx1} "
                f"THEN 1 ELSE 0 END"
            ).alias("_f"),
        )
    return d.select(
        *[c for c in df.columns],
        F.expr(f"_e * 1000 + (_f * 1000) div {1 << _FRAC_BITS}")
        .cast("bigint")
        .alias(out),
    )


def milli_log2_sql(vals_cte: str, keys: str, vcol: str, out_cte: str, out: str) -> str:
    """DuckDB CTE chain computing the same integer milli-log2 recurrence
    as :func:`with_milli_log2` over CTE ``vals_cte`` (columns ``keys`` +
    positive-int64 ``vcol``); emits CTE ``out_cte`` with ``keys`` + ``out``.
    Returned string starts with a comma (appends to an open WITH list)."""
    two_fx1 = 1 << (_FX + 1)
    parts = [
        f""", _ml0 AS (
      SELECT {keys},
             CAST(length(bin({vcol})) - 1 AS BIGINT) AS e,
             CAST(CASE WHEN length(bin({vcol})) - 1 >= {_FX}
                  THEN {vcol} >> (length(bin({vcol})) - 1 - {_FX})
                  ELSE {vcol} << ({_FX} - (length(bin({vcol})) - 1)) END AS BIGINT) AS m,
             CAST(0 AS BIGINT) AS f
      FROM {vals_cte})"""
    ]
    for i in range(1, _FRAC_BITS + 1):
        parts.append(
            f""", _ml{i} AS (
      SELECT {keys}, e,
             CASE WHEN ((m * m) >> {_FX}) >= {two_fx1}
                  THEN ((m * m) >> {_FX}) >> 1 ELSE (m * m) >> {_FX} END AS m,
             f * 2 + CASE WHEN ((m * m) >> {_FX}) >= {two_fx1} THEN 1 ELSE 0 END AS f
      FROM _ml{i - 1})"""
        )
    parts.append(
        f""", {out_cte} AS (
      SELECT {keys}, e * 1000 + (f * 1000) // {1 << _FRAC_BITS} AS {out}
      FROM _ml{_FRAC_BITS})"""
    )
    return "".join(parts)


def milli_log2_int(v: int) -> int:
    """Pure-int Python twin of :func:`with_milli_log2` — the IDENTICAL
    Q20 shift-and-square recurrence, for driver/handler-side kernels
    (the streaming PSI twin) that must agree bit-for-bit with the
    engine and the DuckDB oracle.  Equality across the three forms is
    pinned in tests/test_llm_ops.py."""
    if v <= 0:
        raise ValueError("milli_log2_int needs a positive integer")
    e = v.bit_length() - 1
    m = (v >> (e - _FX)) if e >= _FX else (v << (_FX - e))
    f = 0
    two_fx1 = 1 << (_FX + 1)
    for _ in range(_FRAC_BITS):
        m2 = (m * m) >> _FX
        if m2 >= two_fx1:
            m = m2 >> 1
            f = f * 2 + 1
        else:
            m = m2
            f = f * 2
    return e * 1000 + (f * 1000) // (1 << _FRAC_BITS)


def hash_bucket(gram: Column, buckets: int) -> Column:
    """md5-derived feature bucket (md5 exists identically in both engines;
    xxhash64 is Spark-only — the MinHash lesson)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint") % buckets
    )


def hashed_bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Per-doc hashed-bigram bucket counts (id, bucket, c) — the DSIR
    feature map.  One posexplode + one lag window per corpus (the house
    gram-stream shape; no HOF folds), then a (doc, bucket) groupBy."""
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "w2"),
    )
    win = Window.partitionBy("_id").orderBy("pos")
    grams = (
        tok.select("_id", "pos", "w2", F.lag("w2", 1).over(win).alias("w1"))
        .filter(F.col("w1").isNotNull())
        .select("_id", F.concat_ws(" ", "w1", "w2").alias("gram"))
    )
    return (
        grams.select("_id", hash_bucket(F.col("gram"), buckets).alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_lambda(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    docb: DataFrame | None = None,
) -> DataFrame:
    """The trained DSIR model: per-bucket importance term
    λ_b = [mlog2(p_b+1) − mlog2(P+B)] − [mlog2(q_b+1) − mlog2(Q+B)]
    (milli-log2 of the add-1-smoothed target/raw probability ratio; the
    four log terms are computed separately so no intermediate product
    can overflow int64 at any corpus size).  ≤``buckets`` rows — the
    artifact a scorer broadcasts, batch or streaming.

    ``docb``: optionally pass precomputed ``hashed_bigram_counts(raw)``
    so a caller that also consumes the per-doc counts (``dsir_scores``)
    computes the gram stream once."""
    if docb is None:
        docb = hashed_bigram_counts(raw, text_col, id_col, buckets)
    q = docb.groupBy("bucket").agg(F.sum("c").alias("qc"))
    p = (
        hashed_bigram_counts(target, text_col, id_col, buckets)
        .groupBy("bucket")
        .agg(F.sum("c").alias("pc"))
    )
    # r14 (optimization): the λ tail is BOUNDED at ≤``buckets`` rows per
    # side by construction, at any corpus size — the honest
    # bounded-driver-state pattern (assign_cells / the streaming twin,
    # which already collects this very table).  Collect the two bucket
    # aggregates and run the four milli-log2 recurrences in pure int
    # Python (``milli_log2_int`` — pinned bit-equal to the engine
    # expression chain and the DuckDB CTE in tests/test_llm_ops.py).
    # The previous all-engine tail built FOUR 10-step shift-and-square
    # projection chains plus three joins over ≤1024-row frames — pure
    # plan/codegen overhead (measured ~1.6 s of the 4 s entry at sf0.1);
    # the distributed gram passes, which carry the corpus-sized work,
    # are unchanged.
    qrows = {int(r["bucket"]): int(r["qc"]) for r in q.collect()}
    prows = {int(r["bucket"]): int(r["pc"]) for r in p.collect()}
    ml_qtot = milli_log2_int(sum(qrows.values()) + buckets)
    ml_ptot = milli_log2_int(sum(prows.values()) + buckets)
    # λ per RAW bucket; absent target buckets contribute mlog2(0+1) = 0
    # exactly, so the .get default is the smoothed value, not an
    # approximation.
    lam_rows = [
        (
            b,
            (
                ((milli_log2_int(prows[b] + 1) if b in prows else 0) - ml_ptot)
                - (milli_log2_int(qc + 1) - ml_qtot)
            ),
        )
        for b, qc in sorted(qrows.items())
    ]
    return raw.sparkSession.createDataFrame(
        lam_rows, "bucket bigint, lam_milli bigint"
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Score every ``raw`` doc (with ≥1 bigram) by the DSIR importance
    weight  score_milli = Σ_b c_b · λ_b  (λ from :func:`dsir_lambda`).
    Output: id, n_grams, score_milli — higher = more target-like.

    The per-doc bucket counts feed BOTH the λ training branch (via its
    q aggregate, under a broadcast boundary) and the scoring join;
    Spark's ReuseExchange does not bridge the broadcast, so without a
    cut the corpus gram stream is computed twice (the banded_signatures
    lesson; A/B probe tools/dsir_ab_probe.py: 1.16× at sf0.1, and at
    real scale the recompute is a full second pass over the corpus).
    localCheckpoint docb once; values are bit-identical."""
    docb = hashed_bigram_counts(raw, text_col, id_col, buckets).localCheckpoint()
    lam = dsir_lambda(raw, target, text_col, id_col, buckets, docb=docb)
    return (
        docb.join(F.broadcast(lam), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("lam_milli")).cast("bigint").alias("score_milli"),
        )
        .select(F.col("_id").alias(id_col), "n_grams", "score_milli")
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic DSIR selection: top-k raw docs by importance score
    (score DESC, id ASC — unique total order, catalog rule 4).  The
    paper's Gumbel-noise resampling variant is a randomized smoothing of
    exactly this ranking; the deterministic top-k is the reproducible
    form a pipeline wants."""
    s = dsir_scores(raw, target, text_col, id_col, buckets)
    win = Window.orderBy(F.col("score_milli").desc(), F.col(id_col).asc())
    return (
        s.select("*", F.row_number().over(win).alias("sel_rank"))
        .filter(F.col("sel_rank") <= k)
        .select(id_col, "n_grams", "score_milli", F.col("sel_rank").cast("int").alias("sel_rank"))
    )


def domain_weights(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain mixture reweighting, DoReMi-shaped (Xie et al. 2023,
    "Doremi: Optimizing Data Mixtures" — public): upweight the domains
    the reference distribution explains WORST.  DoReMi's excess loss
    needs a trained proxy model; the engine-side one-shot analogue is
    per-domain divergence from the corpus unigram distribution — the KL
    term `entropy_profile` already computes per doc, aggregated per
    domain and normalized to parts-per-million sampling weights:

      weight_ppm(s) = (Σ_docs∈s max(kl, 0) · 1e6) div Σ_all max(kl, 0)

    (clamped at 0 per doc: the milli-log2 quantization can dip a
    near-zero KL slightly negative, and integer division of negatives
    is the one Spark/DuckDB divergence).  Σ weights ≤ 1e6 by flooring.

    Scale shape: the entropy pipeline (one (doc,word) groupBy + word
    join + per-doc agg) feeds a per-doc row set joined to a 2-column
    pruned (id, domain) projection — dimension-shaped, the heavy
    lineage is not duplicated — then one bounded per-domain aggregate
    and a broadcast 1-row total."""
    from esgopeta_spark.operators.text import entropy_profile

    kl = entropy_profile(docs, text_col, id_col).select(
        id_col, F.greatest(F.col("kl_corpus_milli"), F.lit(0)).alias("_kl")
    )
    dim = docs.select(id_col, domain_col)
    per_dom = (
        kl.join(dim, id_col)
        .groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_kl").cast("bigint").alias("sum_kl_milli"),
        )
    )
    tot = per_dom.agg(F.sum("sum_kl_milli").cast("bigint").alias("_tot"))
    return per_dom.crossJoin(F.broadcast(tot)).select(
        domain_col,
        "n_docs",
        "sum_kl_milli",
        F.expr("(sum_kl_milli * 1000000) div _tot").cast("bigint").alias("weight_ppm"),
    )


def weighted_sample_keys(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """The Efraimidis-Spirakis priority projection shared by the batch
    sampler (:func:`weighted_sample`) and its streaming reservoir twin
    (``streaming.prep.streaming_weighted_sample``): (id, weight, es_key)
    with the integer key ((32000 − mlog2(u)) · 1e6) div w, u from
    md5(id).  Pure codegen (md5 + the shift-and-square log chain) —
    stateless, stream-safe, bit-equal on any engine/partitioning."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") + 1
    )
    w = F.greatest(F.col(weight_col).cast("bigint"), F.lit(1))
    base = df.select(F.col(id_col), w.alias("_w"), u.alias("_u"))
    return with_milli_log2(base, "_u", "_ml").select(
        id_col,
        F.col("_w").alias("weight"),
        F.expr("((32000 - _ml) * 1000000) div _w").cast("bigint").alias("es_key"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, public): each row gets priority u^(1/w) with u drawn
    from md5(id) — keep the k largest priorities.  In integer arithmetic
    (engine-exact, reproducible on any engine/partitioning/rerun):

        u   = first 8 md5 hex chars of the id, as int + 1  (1..2^32)
        key = ((32000 − mlog2(u)) · 1000000) div w         (≥ 0)

    keep the k SMALLEST keys (key ∝ −log2(u)/w, so smallest key ⇔
    largest u^(1/w); ties broken by id — rule 4 unique total order).
    Weights are positive integers (floor at 1).  The subtraction is
    oriented non-negative (mlog2(u) ≤ 32000 for u ≤ 2^32) because
    integer division of negatives is where Spark div and DuckDB //
    disagree.

    Scale shape: one codegen projection + one global top-k (rank window
    under LIMIT) — the same shape as every deterministic selector here;
    at 100 TB swap the global window for a per-partition top-k
    pre-prune, semantics unchanged."""
    keyed = weighted_sample_keys(df, weight_col, id_col)
    win = Window.orderBy(F.col("es_key").asc(), F.col(id_col).asc())
    return (
        keyed.select("*", F.row_number().over(win).alias("sample_rank"))
        .filter(F.col("sample_rank") <= k)
        .select(id_col, "weight", "es_key", F.col("sample_rank").cast("int").alias("sample_rank"))
    )


def perplexity_buckets(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020, public): score every doc against a reference LM, then split
    each language into equal head/middle/tail thirds by score rank —
    the bucket a doc lands in is the CCNet quality tier that downstream
    samplers key on.  CCNet ranks by Kneser-Ney perplexity ascending
    (lower = better); the engine's familiarity score
    (``text.lm_backoff_scores``, integer milli) is oriented higher =
    better, so head = highest per-token mean score.  Bucketing is
    ``ntile`` over a UNIQUE total order (mean DESC, id ASC — catalog
    rule 4), so tiers are reproducible on any engine or partitioning.

    Output: (id, lang, n_scored, mean_score_milli, ppl_bucket 1-based,
    bucket_label head/middle/tail for the 3-bucket default).

    Scale shape: the LM scoring pipeline (two lag windows + count-key
    joins), a 2-column dimension join for the language, then ONE
    per-language window — languages partition the ntile, so no global
    sort; a skewed mega-language is the same single-key pressure as any
    global rank and takes the same per-partition pre-prune if needed."""
    from esgopeta_spark.operators.text import lm_backoff_scores

    s = lm_backoff_scores(train, score, text_col, id_col)
    dim = score.select(id_col, lang_col)
    scored = s.join(dim, id_col).select(
        id_col,
        lang_col,
        "n_scored",
        # n_scored >= 1 by construction (only docs with >=1 full trigram
        # context emit rows); both operands non-negative -> div safe
        F.expr("score_sum_milli div n_scored").cast("bigint").alias(
            "mean_score_milli"
        ),
    )
    win = Window.partitionBy(lang_col).orderBy(
        F.col("mean_score_milli").desc(), F.col(id_col).asc()
    )
    bucketed = scored.select(
        "*", F.ntile(n_buckets).over(win).cast("int").alias("ppl_bucket")
    )
    b = F.col("ppl_bucket")
    label = (
        F.when(b == 1, F.lit("head"))
        .when(b == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        if n_buckets == 3
        else F.concat(F.lit("b"), b.cast("string"))
    )
    return bucketed.select("*", label.alias("bucket_label"))


def mul_ppm_sql(x: str, ppm: str, div: str = "div") -> str:
    """SQL fragment for the exact (x * ppm) div 1e6 on int64 WITHOUT the
    intermediate product (corpus token counts * ppm overflows int64 at
    ~2e13 tokens — i.e. exactly the 100 TB regime): split x = q*1e6 + r,
    then q*ppm + (r*ppm) div 1e6 is the same floor, and r*ppm < 1e12.
    Both operands non-negative (div/% agree across engines only there).
    ``div``: the integer-division operator — "div" (Spark), "//"
    (DuckDB); the rest of the text is engine-identical."""
    return (
        f"(({x}) {div} 1000000) * ({ppm})"
        f" + ((({x}) % 1000000) * ({ppm})) {div} 1000000"
    )


def mixture_materialize(
    docs: DataFrame,
    weights: DataFrame,
    frac_ppm: int = 500_000,
    domain_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Materialize a training mixture under a token budget: given
    per-domain sampling weights (ppm, e.g. from :func:`domain_weights`)
    and a global budget of ``frac_ppm`` of the corpus tokens, select
    docs per domain in a deterministic md5 shuffle order until that
    domain's token budget is filled — the step that turns DoReMi-style
    mixture WEIGHTS into an actual document SELECTION.

      budget_d   = ((total_tokens · frac_ppm) div 1e6 · weight_ppm) div 1e6
      pick_order = first 8 md5 hex chars of the id (uniform shuffle,
                   reproducible on any engine/partitioning/rerun)
      keep doc   ⇔ running Σ n_tokens (pick_order ASC, id ASC) ≤ budget_d

    Greedy prefix packing: the budget is never exceeded; a doc larger
    than the remaining budget ends its domain's intake.  All integer —
    the ppm products use the overflow-free split form (:func:`mul_ppm_sql`)
    so the math is exact at any corpus size.

    Scale shape: one 1-row total (broadcast), one bounded weights join
    (broadcast), then a single per-domain running-sum window — domains
    partition the sort; no global ordering, no self-join; the heavy doc
    relation is traversed once."""
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    # the doc-level base feeds BOTH the corpus-total aggregate and the
    # budget join; cut it once so the (possibly expensive) tokens_col
    # expression — token_count parses the full text — runs one pass,
    # and derive the total FROM the base (the entropy/LM lesson)
    base = docs.select(
        F.col(domain_col),
        F.col(id_col),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
        u.alias("pick_order"),
    ).localCheckpoint()
    total = base.agg(F.sum("n_tokens").cast("bigint").alias("_tot"))
    w = weights.select(domain_col, "weight_ppm")
    budget = F.expr(
        mul_ppm_sql(mul_ppm_sql("_tot", str(int(frac_ppm))), "weight_ppm")
    ).cast("bigint")
    budgeted = (
        base.join(F.broadcast(w), domain_col)
        .crossJoin(F.broadcast(total))
        .select("*", budget.alias("budget_tokens"))
        .drop("_tot")
    )
    win = (
        Window.partitionBy(domain_col)
        .orderBy(F.col("pick_order").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        budgeted.select(
            "*", F.sum("n_tokens").over(win).cast("bigint").alias("cum_tokens")
        )
        .filter(F.col("cum_tokens") <= F.col("budget_tokens"))
        .select(
            domain_col, id_col, "n_tokens", "pick_order", "cum_tokens",
            "budget_tokens",
        )
    )


def mixture_from_corpus(
    docs: DataFrame,
    frac_ppm: int = 500_000,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Single-tokenize fusion of :func:`domain_weights` +
    per-doc token counts + :func:`mixture_materialize` (r14
    optimization, guide §2.3 "shuffle fewer bytes" / §8 "decide with
    small rows"): the unfused entry tokenized the corpus TWICE — once
    inside the entropy pipeline that feeds the domain weights, and once
    more as ``token_count(text)`` for the budget packing.  The entropy
    pipeline already aggregates exactly ``size(words(text))`` per doc
    (Σ of the (doc, word) counts), so ONE entropy pass feeds both
    branches; docs with zero tokens (absent from the entropy output,
    since explode emits no rows) are restored by a left join from the
    (id, domain) dimension with ``coalesce(n_tokens, 0)`` — bit-equal
    to ``token_count`` on every row (empty text -> 0), proven row-exact
    against the unfused formulation at sf0.01/sf0.1.

    Scale shape: one tokenize scan (was two), one checkpointed per-doc
    profile reused by the weights branch and the token branch, then the
    bounded-weights broadcast + per-domain window of
    :func:`mixture_materialize` unchanged."""
    from esgopeta_spark.operators.text import entropy_profile

    ep = entropy_profile(docs, text_col, id_col).localCheckpoint()
    dim = docs.select(id_col, domain_col)
    kl = ep.select(
        id_col, F.greatest(F.col("kl_corpus_milli"), F.lit(0)).alias("_kl")
    )
    per_dom = (
        kl.join(dim, id_col)
        .groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_kl").cast("bigint").alias("sum_kl_milli"),
        )
    )
    tot = per_dom.agg(F.sum("sum_kl_milli").cast("bigint").alias("_tot"))
    w = per_dom.crossJoin(F.broadcast(tot)).select(
        domain_col,
        "n_docs",
        "sum_kl_milli",
        F.expr("(sum_kl_milli * 1000000) div _tot").cast("bigint").alias("weight_ppm"),
    )
    toks = dim.join(ep.select(id_col, "n_tokens"), id_col, "left").select(
        domain_col,
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
    )
    return mixture_materialize(
        toks, w, frac_ppm=frac_ppm, domain_col=domain_col, id_col=id_col
    )


def dsir_scores_with_lambda(
    raw: DataFrame,
    lam: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """Score docs against a PERSISTED λ model (``dsir_lambda`` written
    to parquet and reloaded) — the deployed-model path; bit-identical
    to training inline (integer λ round-trips storage exactly).  Same
    plan tail as :func:`dsir_scores`."""
    docb = hashed_bigram_counts(raw, text_col, id_col, buckets)
    return (
        docb.join(F.broadcast(lam), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.col("lam_milli")).cast("bigint").alias("score_milli"),
        )
        .select(F.col("_id").alias(id_col), "n_grams", "score_milli")
    )


def length_balanced_sample(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """LENGTH-distribution balancing (r12): web corpora are badly
    length-skewed and a length-biased sample biases everything trained
    on it — this op flattens the token-length distribution to uniform
    across ``n_buckets`` quantile buckets by per-bucket deterministic
    downsampling (the DSIR/DoReMi shape applied to the LENGTH marginal
    instead of the content distribution).

    Mechanics, engine-exact end to end:
    - bucket = exact ntile(B) under the unique total order (n_tok, id)
      — computed WITHOUT a global-order window (the single-partition
      scale-killer the plan audits hunt): global rank = per-n_tok
      row_number (a KEYED window) + the cumulative offset of smaller
      n_tok values (a window over the tiny distinct-length relation),
      then the closed-form ntile bucket formula (larger buckets first,
      the SQL definition) from the broadcast total
    - per-bucket keep rate r_b = min(1e6, (N·1e6) div (B·c_b)) ppm —
      buckets above the uniform share downsample, the rest keep all
    - keep iff the doc's md5 uniform draw (first 8 hex chars, the
      split_shards idiom) < (r_b · 16^8) div 1e6 — deterministic,
      partition-invariant, stable under reruns

    Output per doc: (id, n_tok, bucket, keep_ppm, kept).  The oracle
    runs DuckDB's plain ntile() OVER (ORDER BY n_tok, id) — same
    definition, so the decomposition is hash-proven equivalent.

    Scale shape: one n_tok-keyed window shuffle over the corpus; the
    offset/count/total relations are tiny (distinct lengths, B rows,
    1 row) and broadcast; the threshold is codegen."""
    from esgopeta_spark.operators.text import regex_token_count

    B = int(n_buckets)
    base = df.select(
        F.col(id_col),
        regex_token_count(F.col(text_col)).cast("bigint").alias("n_tok"),
    )
    # exact global rank under (n_tok, id), no global window:
    iw = Window.partitionBy("n_tok").orderBy(F.col(id_col).asc())
    ranked = base.withColumn("_ir", F.row_number().over(iw).cast("bigint"))
    lens = base.groupBy("n_tok").agg(F.count(F.lit(1)).cast("bigint").alias("_lc"))
    ow = Window.orderBy(F.col("n_tok").asc())  # tiny relation: distinct lengths
    offs = lens.withColumn(
        "_off",
        F.coalesce(
            F.sum("_lc").over(ow.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("bigint"),
        ),
    ).select("n_tok", "_off")
    tot = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    r = (
        ranked.join(F.broadcast(offs), "n_tok")
        .join(F.broadcast(tot))
        .withColumn("_rank", F.col("_off") + F.col("_ir"))
    )
    # closed-form ntile (larger buckets first): q = N div B, rem = N mod B
    bucket = F.expr(
        f"CASE WHEN _rank <= (_n % {B}) * (_n div {B} + 1) "
        f"THEN (_rank - 1) div (_n div {B} + 1) + 1 "
        f"ELSE (_n % {B}) + (_rank - (_n % {B}) * (_n div {B} + 1) - 1) "
        f"div (_n div {B}) + 1 END"
    ).cast("int")
    bucketed = r.withColumn("bucket", bucket)
    counts = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    j = bucketed.join(F.broadcast(counts), "bucket")
    rate_sql = f"least(CAST(1000000 AS BIGINT), (_n * 1000000) div ({B} * _c))"
    draw = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return j.select(
        id_col, "n_tok", "bucket",
        F.expr(rate_sql).cast("bigint").alias("keep_ppm"),
        (draw < F.expr(f"({rate_sql} * {16 ** 8}) div 1000000"))
        .cast("int").alias("kept"),
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 512,
    shard_col: str = "shard",
    id_col: str = "doc_id",
    n_col: str = "n_tokens",
) -> DataFrame:
    """SEQUENCE PACKING (r14) — the pretraining batcher's step between
    selection and tokenized shards: documents greedily pack into
    fixed-token-budget training bins in a DETERMINISTIC order (id
    ascending within a shard), so every worker reproduces the same
    bins without coordination.  A document longer than the budget
    TRUNCATES to it and takes a bin of its own, flagged visibly
    (``truncated=1``) — never silently dropped or silently split.

        run_1 = neff_1;  bin_1 = 0
        run_i, bin_i = (neff_i, bin+1)      if run + neff_i > budget
                       (run + neff_i, bin)  otherwise

    The recursion has no closed window form (capacity RESETS depend on
    every prior row), so the Spark side runs it exactly like
    :func:`esgopeta_spark.operators.timeseries.ewma_smooth`: ONE Arrow
    ``mapInPandas`` pass over shard-sorted partitions with cross-batch
    carry, and the oracle runs the identical recurrence as a DuckDB
    RECURSIVE CTE.  All-integer state.

    Output: (id, shard, n_tokens, bin_idx, bin_offset, truncated).

    Scale shape: one repartition-by-shard + in-partition sort + one
    Arrow pass — a shard costs one task of O(its docs), the same
    contract as any per-key window; bins never cross shards, so 1000
    executors pack 1000 shards with zero coordination."""
    import pandas as pd

    budget = int(max_tokens)
    if budget <= 0:
        raise ValueError("max_tokens must be positive")
    part = (
        df.select(
            F.col(shard_col).cast("bigint").alias("_s"),
            F.col(id_col).cast("bigint").alias("_i"),
            F.col(n_col).cast("bigint").alias("_n"),
        )
        .repartition("_s")
        .sortWithinPartitions("_s", "_i")
    )

    def kernel(batches):
        cur, run, bin_idx = None, 0, 0
        for pdf in batches:
            ids, sh, ns, bins, offs, tr = [], [], [], [], [], []
            for s, i, n in zip(pdf["_s"], pdf["_i"], pdf["_n"]):
                s, i, n = int(s), int(i), int(n)
                neff = min(n, budget)
                if s != cur:
                    cur, run, bin_idx = s, neff, 0
                elif run + neff > budget:
                    bin_idx += 1
                    run = neff
                else:
                    run += neff
                ids.append(i)
                sh.append(s)
                ns.append(n)
                bins.append(bin_idx)
                offs.append(run - neff)
                tr.append(1 if n > budget else 0)
            if ids:
                yield pd.DataFrame({
                    id_col: pd.Series(ids, dtype="int64"),
                    shard_col: pd.Series(sh, dtype="int64"),
                    n_col: pd.Series(ns, dtype="int64"),
                    "bin_idx": pd.Series(bins, dtype="int64"),
                    "bin_offset": pd.Series(offs, dtype="int64"),
                    "truncated": pd.Series(tr, dtype="int32"),
                })

    return part.mapInPandas(
        kernel,
        f"{id_col} bigint, {shard_col} bigint, {n_col} bigint, "
        "bin_idx bigint, bin_offset bigint, truncated int",
    )
