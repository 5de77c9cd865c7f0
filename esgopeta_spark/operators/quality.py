"""Declarative data-quality auditing (the Deequ / dbt-test shape, public
pattern): a pipeline states row-validity predicates over a table and gets
per-constraint violation counts back.  At 100 TB the only acceptable plan
is ONE pass: every predicate folds into a single partial-aggregated
codegen aggregate (conditional sums), never one scan per constraint.
Referential checks (key exists in a dimension) are the exception — each
needs its own anti-join — and stay separate by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_audit(df: DataFrame, constraints: dict[str, Column]) -> DataFrame:
    """Each constraint maps name -> boolean Column meaning "row is valid";
    NULL counts as a violation (unknown is not valid).  Returns long form
    (check_name, n_rows, n_violations, violation_ppm) — one row per
    constraint, all from ONE scan + ONE 1-row aggregate.
    """
    if not constraints:
        raise ValueError("constraint_audit needs at least one constraint")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")] + [
        F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))).cast("bigint").alias(f"_v_{i}")
        for i, cond in enumerate(constraints.values())
    ]
    wide = df.agg(*aggs)
    names = list(constraints)
    # names are spliced into SQL text: escape quotes so a name like
    # "amount isn't null" cannot break the stack() expression
    stack = ", ".join("'{}', _v_{}".format(n.replace("'", "''"), i) for i, n in enumerate(names))
    return (
        wide.select(
            F.expr(f"stack({len(names)}, {stack}) as (check_name, n_violations)"),
            F.col("_n").alias("n_rows"),
        )
        .select(
            "check_name",
            "n_rows",
            "n_violations",
            F.expr("CASE WHEN n_rows > 0 THEN (n_violations * 1000000) div n_rows ELSE 0 END")
            .cast("bigint")
            .alias("violation_ppm"),
        )
    )


def referential_audit(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, name: str
) -> DataFrame:
    """Foreign-key existence check as ONE anti-join + count: rows of
    ``fact`` whose key has no match in ``dim`` are violations.  Same
    output shape as ``constraint_audit`` so the two union into one
    report."""
    n_rows = fact.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    viol = (
        fact.select(F.col(fact_key).alias("_k"))
        .join(dim.select(F.col(dim_key).alias("_k")), "_k", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )
    return (
        n_rows.crossJoin(viol)  # two 1-row aggregates
        .select(
            F.lit(name).alias("check_name"),
            "n_rows",
            "n_violations",
            F.expr("CASE WHEN n_rows > 0 THEN (n_violations * 1000000) div n_rows ELSE 0 END")
            .cast("bigint")
            .alias("violation_ppm"),
        )
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list, k: int = 5
) -> DataFrame:
    """k-anonymity check over a set of quasi-identifier columns (public
    privacy notion, Sweeney 2002): every combination of quasi-identifier
    values shared by FEWER than ``k`` rows re-identifies those rows —
    the release/training-data privacy audit run before publishing any
    per-person table.  Returns one row per VIOLATING equivalence class
    (the quasi values + its size); empty result = the table is
    k-anonymous under these columns.

    Scale shape: one partial-agg shuffle on the quasi tuple — identical
    to any groupBy count; the violating-class output is bounded by the
    number of small classes, which is what the auditor reads."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < F.lit(int(k)))
    )


def l_diversity_audit(
    df: DataFrame, quasi_cols: list, sensitive_col: str, l: int = 3
) -> DataFrame:
    """l-diversity check (Machanavajjhala et al. 2007 — the privacy
    notion k-anonymity is NOT enough for: a k-large equivalence class
    whose SENSITIVE attribute is constant still discloses it for every
    member): every quasi-identifier class must see at least ``l``
    distinct sensitive values.  Returns one row per VIOLATING class
    (quasi values, class size, distinct sensitive count); empty result
    = the release is l-diverse.  Run BESIDE :func:`k_anonymity_audit`
    — the two audits catch disjoint disclosure modes.

    Scale shape: one partial-agg shuffle on the quasi tuple with a
    distinct-count (map-side partial via the per-group distinct
    expand); output bounded by violating classes."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < F.lit(int(l)))
    )


def t_closeness_audit(
    df: DataFrame, quasi_cols: list, sensitive_col: str, t_milli: int = 300
) -> DataFrame:
    """t-closeness check (Li et al. 2007 — the refinement after
    l-diversity: a class can be diverse yet still SKEWED far from the
    table-wide sensitive distribution, leaking probabilistic
    information): per quasi class, the total-variation distance
    between its sensitive distribution and the global one, in EXACT
    integer milli —

        tv_milli = sum_s |n_cs*Ng - n_gs*Nc| * 1000 div (2*Nc*Ng)

    (one floor at the end; every term int64 at any realistic table).
    Returns one row per class whose distance EXCEEDS ``t_milli`` —
    empty result = the release is t-close.  The trio
    k-anonymity / l-diversity / t-closeness catches the three
    disclosure modes a per-person release has.

    Scale shape: one (quasi, sensitive) partial-agg shuffle; the
    global distribution is sensitive-cardinality rows and BROADCASTS
    back; one per-class rollup."""
    cs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_ncs")
    )
    g = df.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("_ngs"))
    nc = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_nc"))
    # deferred 1-row table-size aggregate, broadcast-cross-joined in —
    # NOT a driver .count(): keeps the entry lazy (catalog rule)
    ngdf = df.agg(F.count(F.lit(1)).cast("bigint").alias("_ng"))
    # classes miss some sensitive values: n_cs = 0 contributes
    # |0 - n_gs*Nc| — build the full (class x global-sensitive) grid
    # from the BROADCAST global side so absent cells count
    grid = nc.crossJoin(F.broadcast(g)).crossJoin(F.broadcast(ngdf))
    joined = grid.join(
        cs, [*quasi_cols, sensitive_col], "left"
    ).select(
        *quasi_cols, "_nc", "_ng",
        F.coalesce("_ncs", F.lit(0)).alias("_ncs"), "_ngs",
    )
    diff = F.abs(
        F.col("_ncs").cast("bigint") * F.col("_ng")
        - F.col("_ngs").cast("bigint") * F.col("_nc").cast("bigint")
    )
    per_class = joined.groupBy(*quasi_cols, "_nc", "_ng").agg(
        F.sum(diff).alias("_sd")
    )
    tv = F.expr("(_sd * 1000) DIV (2 * _nc * _ng)").cast("bigint")
    return (
        per_class.select(
            *quasi_cols,
            F.col("_nc").cast("bigint").alias("class_size"),
            tv.alias("tv_milli"),
        )
        .filter(F.col("tv_milli") > F.lit(int(t_milli)))
    )


def corpus_datasheet(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
    short_tokens: int = 20,
    long_tokens: int = 200,
) -> DataFrame:
    """The one-row release DATASHEET every corpus ships with (r12 —
    the "Datasheets for Datasets" summary, Gebru et al. 2018, public):
    size, emptiness, token mass, language/source breadth, exact-dup
    mass, and the length-tail shape — the numbers a consumer reads
    before a single training token is spent.

      n_docs, n_empty            rows; rows with null/empty text
      total_tokens               Σ whitespace-token counts (exact)
      mean_tokens_milli          (total·1000) div n_docs
      n_langs, n_sources         exact distinct
      n_dup_docs                 docs whose normalized text occurs >= 2
                                 (the exact_dedup key — every copy
                                 counts, including the keeper)
      dup_milli                  (n_dup_docs·1000) div n_docs
      n_short / n_long           docs under/over the token thresholds

    Exact integers end to end.  Scale shape: one partial-agg pass for
    the global sums + ONE hash groupBy on the normalized-text key for
    the dup mass (the same shuffle exact_dedup pays) joined back as a
    1-row broadcast — two shuffles total, output one row."""
    from esgopeta_spark.operators.dedup import normalize_text

    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+", -1))
    ).cast("bigint")
    base = df.select(
        F.col(id_col),
        F.col(lang_col),
        F.col(source_col),
        t.alias("_t"),
        toks.alias("_n"),
        normalize_text(t).alias("_k"),
    )
    dup_mass = (
        base.groupBy("_k").agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= 2)
        .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("n_dup_docs"))
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.length(F.trim("_t")) == 0).cast("bigint")).cast("bigint")
        .alias("n_empty"),
        F.sum("_n").cast("bigint").alias("total_tokens"),
        F.countDistinct(lang_col).cast("bigint").alias("n_langs"),
        F.countDistinct(source_col).cast("bigint").alias("n_sources"),
        F.sum((F.col("_n") < short_tokens).cast("bigint")).cast("bigint")
        .alias("n_short"),
        F.sum((F.col("_n") > long_tokens).cast("bigint")).cast("bigint")
        .alias("n_long"),
    )
    return stats.join(F.broadcast(dup_mass)).select(
        "n_docs", "n_empty", "total_tokens",
        F.expr("(total_tokens * 1000) div n_docs").cast("bigint")
        .alias("mean_tokens_milli"),
        "n_langs", "n_sources", "n_dup_docs",
        F.expr("(n_dup_docs * 1000) div n_docs").cast("bigint")
        .alias("dup_milli"),
        "n_short", "n_long",
    )


def length_bucket(
    text_col: str, n_buckets: int = 10, bucket_chars: int = 200
):
    """The PSI length-bucket projection — stateless, shared by the
    batch :func:`snapshot_drift_psi` and the streaming twin
    (streaming/windows.streaming_psi_drift): bucket = length div
    ``bucket_chars``, capped at ``n_buckets``-1.  Factored so the two
    forms share one definition rather than mirroring it."""
    return F.least(
        F.expr(f"length(coalesce({text_col}, '')) div {int(bucket_chars)}"),
        F.lit(int(n_buckets - 1)),
    ).cast("bigint")


def snapshot_drift_psi(
    prior: DataFrame,
    current: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10,
    bucket_chars: int = 200,
) -> DataFrame:
    """Population-stability-index drift between two corpus snapshots
    (r13 — the nightly-loop monitoring step beside incremental dedup:
    a silent scraper change shifts the LENGTH DISTRIBUTION long before
    it shows in per-doc quality flags; PSI over a fixed bucketing is
    the standard drift alarm, >0.2 bits conventionally "significant").

        PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

    computed here ENGINE-EXACTLY in integers (never libm — the Q20
    milli-log2 discipline): buckets are length-div-``bucket_chars``
    capped at ``n_buckets``-1; per-side shares in ppm with
    greatest(.,1) smoothing (empty buckets stay log-defined — the
    standard epsilon, made integer); each bucket's contribution is the
    RAW product (p_ppm - q_ppm) * (mlog2(p_ppm) - mlog2(q_ppm)) in
    nano-bit units (ppm x millibit), non-negative by log monotonicity,
    and the total rides a window sum.  Base-2 instead of natural log —
    a constant factor documented in the name (nanoBITs).

    Plan (r14 optimization): one partial-agg pass per side on the
    bucket key (the only distributed work — each collapses the corpus
    to <= ``n_buckets`` rows at ANY corpus size), then the bounded
    driver-state tail (the codebook / dsir_lambda doctrine): shares,
    milli-log2s, contributions and the PSI total are pure-int Python
    over the two collected <= ``n_buckets``-row aggregates, via
    ``milli_log2_int`` — pinned bit-equal to the engine expression
    chain and the DuckDB CTE, so every value is identical to the
    previous all-engine form (which spent its time on two 10-step
    shift-and-square projection chains, a spine join per side and two
    single-partition window sums over a 10-row frame — pure plan
    overhead).  Returns one row per bucket:
    (bucket, p_ppm, q_ppm, contrib_nanobits, psi_nanobits)."""
    from esgopeta_spark.operators.selection import milli_log2_int

    def ppm_list(df: DataFrame) -> list[int]:
        cnt = (
            df.select(
                length_bucket(text_col, n_buckets, bucket_chars).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("_c"))
            .collect()
        )
        c = {int(r["bucket"]): int(r["_c"]) for r in cnt}
        t = sum(c.values())
        # `_num div _t` on non-negative bigints == Python //; an empty
        # side (t == 0) mirrors greatest(null, 1) = 1 from the old form
        return [
            max((c.get(b, 0) * 1000000) // t, 1) if t > 0 else 1
            for b in range(int(n_buckets))
        ]

    p = ppm_list(prior)
    q = ppm_list(current)
    contrib = [
        (p[b] - q[b]) * (milli_log2_int(p[b]) - milli_log2_int(q[b]))
        for b in range(int(n_buckets))
    ]
    psi = sum(contrib)
    return prior.sparkSession.createDataFrame(
        [(b, p[b], q[b], contrib[b], psi) for b in range(int(n_buckets))],
        "bucket bigint, p_ppm bigint, q_ppm bigint, "
        "contrib_nanobits bigint, psi_nanobits bigint",
    )


def psi_prior_ppm(
    prior: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10,
    bucket_chars: int = 200,
) -> list:
    """The PRIOR snapshot's smoothed bucket shares as a bounded
    driver-side list (``n_buckets`` ints, ppm, greatest(.,1) — the
    same integer formulas as :func:`snapshot_drift_psi`'s p side) —
    the honest driver-state pattern (codebook doctrine): the prior
    distribution is a fixed, tiny reference the streaming PSI twin
    closes over, exactly like the k-means codebook."""
    cnt = {
        int(r["bucket"]): int(r["_c"])
        for r in prior.select(
            length_bucket(text_col, n_buckets, bucket_chars).alias("bucket")
        ).groupBy("bucket").agg(F.count("*").alias("_c")).collect()
    }
    total = sum(cnt.values())
    if total == 0:
        raise ValueError("prior snapshot is empty")
    return [
        max((cnt.get(b, 0) * 1000000) // total, 1) for b in range(n_buckets)
    ]
