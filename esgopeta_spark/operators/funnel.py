"""Event-funnel analytics (the ordered-conversion staple of product
analytics) — an E4/E5 aggregation shape over (user, event_type, ts)
streams, kept apart from the text/token operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    checkpoint: str = "local",
) -> DataFrame:
    """Ordered-funnel conversion: for each stage k, count users who have
    at least one stage-k event strictly after their EARLIEST qualifying
    stage-(k-1) event (the user's qualifying time for stage k is the
    earliest such event, and the chain continues from it).  Note the
    semantics: a user whose first stage-k event precedes the chain but
    who repeats the stage later still converts — the operator answers
    "did the stages happen in order at least once", not "was the very
    first stage-k event in order".

    Returns (stage_idx, stage, n_users), one row per stage,
    engine-exact (epoch-millisecond integers, MIN aggregates).

    Plan shape: one filtered partial-agg pass per stage (min qualifying
    ts per user), each joined against the previous stage's user set — k
    narrow (user, ts) shuffles for a k-stage funnel, no windows, no
    arrays, no per-user state.  Each stage's user set is lineage-cut per
    the ``checkpoint`` knob (operators/checkpoint.py) so the per-stage
    plan stays flat instead of nesting all prior stages (the CLAUDE.md
    driver-loop rule); each set also fans out twice (its count + the
    next stage's join).  At 100 TB pre-partition events by user so every
    per-stage aggregate and join co-locates.
    """
    from esgopeta_spark.operators.checkpoint import materialize

    if not stages:
        raise ValueError("stages must be non-empty")
    ts_ms = F.unix_millis(F.col(ts_col))
    prev = None
    counts = []
    for i, stage in enumerate(stages):
        cur = events.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("_u"), ts_ms.alias("_t")
        )
        if prev is None:
            reached = cur.groupBy("_u").agg(F.min("_t").alias("_t"))
        else:
            reached = (
                cur.join(prev.withColumnRenamed("_t", "_pt"), "_u")
                .filter(F.col("_t") > F.col("_pt"))
                .groupBy("_u")
                .agg(F.min("_t").alias("_t"))
            )
        reached = materialize(reached, checkpoint)
        counts.append(
            reached.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("stage_idx"), F.lit(stage).alias("stage"), "n_users"
            )
        )
        prev = reached
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
