"""Windowed streaming aggregations (SURVEY.md §2 F2-F4) — thin,
watermark-correct wrappers over the stock operators so batch and stream
share one definition (the batch-equivalence tests run these same
functions on a static DataFrame)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound; only applies to streaming frames (no-op on batch)."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def tumbling_counts(events: DataFrame, width: str = "1 hour", ts_col: str = "ts") -> DataFrame:
    e = with_watermark(events, ts_col)
    return (
        e.groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.unix_millis("w.start").alias("w_start_ms"), "event_type", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    e = with_watermark(events, ts_col)
    return (
        e.groupBy(F.window(ts_col, width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_millis("w.start").alias("w_start_ms"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts") -> DataFrame:
    e = with_watermark(events, ts_col)
    return (
        e.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.unix_millis("w.start").alias("session_start_ms"), "n_events")
    )


def windowed_cms_state(
    events: DataFrame,
    width: str = "1 hour",
    key_col: str = "user_id",
    depth: int = 4,
    n_buckets: int = 256,
    ts_col: str = "ts",
) -> DataFrame:
    """Count-Min sketch state PER EVENT-TIME WINDOW — the streaming
    heavy-hitters shape: each window accumulates a depth x n_buckets
    int64 counter grid (operators/sketches.cms_bucket — same Lehmer hash
    family, so the state is exchangeable with the batch sketch); point
    queries and thresholding run downstream over the tiny grid rows.

    Streaming-safe by construction: the per-row bucket projection is
    stateless, and the only stateful operator is the windowed count
    aggregate — watermark-bounded, partial-aggregated map-side, at most
    depth * n_buckets rows of state per window.  Batch ≡ stream over the
    same function is pinned in tests/test_streaming.py.
    """
    from esgopeta_spark.operators.sketches import cms_bucket

    e = with_watermark(events, ts_col)
    # one pass with an exploded depth column (the batch cms_state shape)
    # instead of a union of per-row selects — on a stream the union also
    # multiplied the source
    grid = e.select(
        F.window(ts_col, width).alias("w"),
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("cms_row"),
        F.col(key_col).alias("_k"),
    ).select(
        "w",
        "cms_row",
        cms_bucket(F.col("_k"), F.col("cms_row"), n_buckets).alias("cms_bucket"),
    )
    return (
        grid.groupBy("w", "cms_row", "cms_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(F.unix_millis("w.start").alias("w_start_ms"), "cms_row", "cms_bucket", "cnt")
    )


# ---------------------------------------------------------------------------
# r12: windowed KMV distinct — the distinct-family sketch joins CMS in
# having a streaming form (windowed_cms_state has carried the
# frequency family since r6).
# ---------------------------------------------------------------------------

KMV_WIN_OUTPUT_SCHEMA = (
    "w_start_ms bigint, n_kept bigint, est_distinct bigint, upd_seq bigint"
)


def streaming_kmv_distinct(
    events: DataFrame,
    width_ms: int = 3600_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count sketch PER EVENT-TIME WINDOW on a stream —
    the approximate-distinct companion to ``windowed_cms_state``.  The
    per-row hash is the SAME Lehmer projection as the batch sketch
    (``sketches.kmv_hash`` — stateless, share don't mirror); the k-min
    SET per window is order-independent (a merge of all arrivals), so
    the handler's state is just the current sorted k-minimum list and
    the stream CONVERGES to the batch ``kmv_distinct`` verdict under
    any arrival order — pinned in tests/test_streaming.py.  Each batch
    that changes a window's k-set re-emits that window's estimate with
    a higher ``upd_seq`` (take the max downstream).

    A rank window (the batch formulation) is not stream-legal; the
    applyInPandasWithState handler IS the k-smallest combine, state
    bounded at k int64s per window."""
    import json as _json

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from esgopeta_spark.operators.sketches import KMV_MOD, kmv_hash

    hashed = events.select(
        F.expr(
            f"(unix_millis({ts_col}) div {int(width_ms)}) * {int(width_ms)}"
        ).cast("bigint").alias("w_start_ms"),
        kmv_hash(F.col(key_col)).alias("h"),
    )
    kk, mod = int(k), int(KMV_MOD)

    def handler(key, pdfs, gstate):
        (w,) = key
        new = set()
        for pdf in pdfs:
            new.update(int(h) for h in pdf["h"])
        if not new:
            return
        import pandas as _pd

        if gstate.exists:
            st = gstate.get
            mins = _json.loads(st[0])
            seq = int(st[1])
        else:
            mins, seq = [], 0
        merged = sorted(set(mins) | new)[:kk]
        if merged == mins:
            return  # the k-set is unchanged: nothing to re-emit
        seq += 1
        gstate.update((_json.dumps(merged), seq))
        n = len(merged)
        est = ((kk - 1) * mod) // merged[kk - 1] if n == kk else n
        yield _pd.DataFrame(
            [{"w_start_ms": int(w), "n_kept": n, "est_distinct": est,
              "upd_seq": seq}]
        )

    state_schema = StructType(
        [StructField("mins", StringType()), StructField("seq", LongType())]
    )
    return hashed.groupBy("w_start_ms").applyInPandasWithState(
        handler,
        outputStructType=KMV_WIN_OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PSI_WIN_OUTPUT_SCHEMA = (
    "w_start_ms bigint, bucket bigint, p_ppm bigint, q_ppm bigint, "
    "contrib_nanobits bigint, psi_nanobits bigint, upd_seq bigint"
)


def streaming_psi_drift(
    docs: DataFrame,
    prior_p_ppm: list,
    width_ms: int = 3600_000,
    text_col: str = "text",
    ts_col: str = "ts",
    n_buckets: int = 10,
    bucket_chars: int = 200,
) -> DataFrame:
    """PSI snapshot drift PER EVENT-TIME WINDOW on a stream (r14, r13
    verdict #4 — closes the one r13 batch op without a stream form):
    each window's length-bucket distribution against a FIXED prior
    snapshot's shares, the nightly-loop drift alarm running live.

    Shares, don't mirror: the per-row bucket projection is the batch
    op's own ``quality.length_bucket``; the prior side is the bounded
    driver-state list ``quality.psi_prior_ppm`` computes (n_buckets
    ints — the codebook doctrine: a fixed tiny reference the handler
    closes over); the per-bucket log ride is ``selection.
    milli_log2_int``, the pure-int twin PINNED bit-equal to the
    engine's Q20 recurrence.  Handler state is the additive per-bucket
    count vector (order-independent), so the stream CONVERGES: the
    final max-``upd_seq`` rows per window equal the batch
    ``snapshot_drift_psi`` on that window's documents under ANY
    arrival order — pinned in tests/test_streaming.py.  Each batch
    that changes a window re-emits its full ``n_buckets``-row PSI
    table with a higher ``upd_seq`` (take the max downstream); state
    is ``n_buckets`` int64s + a seq per window."""
    import json as _json

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from esgopeta_spark.operators.quality import length_bucket
    from esgopeta_spark.operators.selection import milli_log2_int

    if len(prior_p_ppm) != int(n_buckets):
        raise ValueError("prior_p_ppm must have n_buckets entries")
    p_ppm = [int(x) for x in prior_p_ppm]
    if any(x < 1 for x in p_ppm):
        raise ValueError("prior shares must be >= 1 ppm (smoothed)")
    nb = int(n_buckets)

    bucketed = docs.select(
        F.expr(
            f"(unix_millis({ts_col}) div {int(width_ms)}) * {int(width_ms)}"
        ).cast("bigint").alias("w_start_ms"),
        length_bucket(text_col, nb, bucket_chars).alias("bucket"),
    )

    mlp = [milli_log2_int(x) for x in p_ppm]

    def handler(key, pdfs, gstate):
        (w,) = key
        add = [0] * nb
        got = False
        for pdf in pdfs:
            for b in pdf["bucket"]:
                add[int(b)] += 1
                got = True
        if not got:
            return
        import pandas as _pd

        if gstate.exists:
            st = gstate.get
            counts = _json.loads(st[0])
            seq = int(st[1])
        else:
            counts, seq = [0] * nb, 0
        counts = [c + a for c, a in zip(counts, add)]
        seq += 1
        gstate.update((_json.dumps(counts), seq))
        total = sum(counts)
        q_ppm = [max((c * 1000000) // total, 1) for c in counts]
        contrib = [
            (p - q) * (mp - milli_log2_int(q))
            for p, q, mp in zip(p_ppm, q_ppm, mlp)
        ]
        psi = sum(contrib)
        yield _pd.DataFrame(
            {
                "w_start_ms": [int(w)] * nb,
                "bucket": list(range(nb)),
                "p_ppm": p_ppm,
                "q_ppm": q_ppm,
                "contrib_nanobits": contrib,
                "psi_nanobits": [psi] * nb,
                "upd_seq": [seq] * nb,
            }
        )

    state_schema = StructType(
        [StructField("counts", StringType()), StructField("seq", LongType())]
    )
    return bucketed.groupBy("w_start_ms").applyInPandasWithState(
        handler,
        outputStructType=PSI_WIN_OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
