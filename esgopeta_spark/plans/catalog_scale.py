"""Scale-operator catalog additions: as-of / range joins (the two classic
joins Spark lacks natively), embedding-cosine near-dup, IVF similarity,
and deeper TPC-H-shaped coverage.  Same determinism rules as catalog.py
(see its module docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esgopeta_spark.plans.catalog import T, money, pct, register


@register(
    "join_asof_purchase_click",
    "E3",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(c.ts) AS click_us,
           CAST(floor(c.value * 1000000 + 0.5) AS BIGINT) AS click_value_micro
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="as-of (point-in-time) join: latest click at-or-before each purchase, per user; "
    "union+last-carry formulation — one shuffle on the key, no range explosion "
    "(operators/asof.py; (user_id, ts) is unique in the data so the match is total-ordered)",
)
def join_asof_purchase_click(spark, sf):
    from esgopeta_spark.operators.asof import asof_join

    ev = T(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value")
    )
    out = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="click_ts",
        right_value_cols=["click_ts", "click_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.unix_micros("click_ts").alias("click_us"),
        F.floor(F.col("click_value") * 1000000.0 + 0.5).cast("bigint").alias("click_value_micro"),
    )


@register(
    "join_range_acctbal_band",
    "E3",
    """
    SELECT s_suppkey,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM supplier JOIN customer
      ON c_acctbal >= s_acctbal - 50 AND c_acctbal < s_acctbal + 50
    GROUP BY s_suppkey
    """,
    doc="range (interval-containment) join via bucketed equi-join: customers whose "
    "balance falls in each supplier's +/-50 band (operators/asof.py range_join — "
    "intervals explode to overlapped buckets, equi-join on bucket, exact residual filter; "
    "Catalyst never falls back to a nested-loop cross product)",
)
def join_range_acctbal_band(spark, sf):
    from esgopeta_spark.operators.asof import range_join

    cust = T(spark, sf, "customer").select("c_custkey", "c_acctbal")
    supp = T(spark, sf, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 50).alias("_lo"),
        (F.col("s_acctbal") + 50).alias("_hi"),
    )
    joined = range_join(cust, supp, point_col="c_acctbal", start_col="_lo", end_col="_hi", bucket_width=100.0)
    return joined.groupBy("s_suppkey").agg(
        F.count("*").alias("n_cust"),
        F.sum(money("c_acctbal")).cast("double").alias("sum_acctbal"),
    )


@register(
    "dedup_embedding_exact",
    "G2",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cs
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, CAST(floor(cs * 1000000 + 0.5) AS BIGINT) AS cosine_micro
    FROM p WHERE cs >= 0.4
    """,
    doc="embedding-cosine near-dup, exact all-pairs tier (the oracle for the LSH tier); "
    "unrolled codegen'd dot kernel, threshold chosen off any float boundary in the data",
)
def dedup_embedding_exact(spark, sf):
    from esgopeta_spark.operators.similarity import embedding_dup_pairs_exact

    emb = T(spark, sf, "embeddings")
    out = embedding_dup_pairs_exact(emb, threshold=0.4, dim=64)
    return out.select(
        "id_a", "id_b", F.floor(F.col("cosine_sim") * 1000000.0 + 0.5).cast("bigint").alias("cosine_micro")
    )


def _emb_lsh_oracle() -> str:
    """Full-pipeline DuckDB oracle for the LSH near-dup tier (r6): plane
    constants inlined via repr(), bucket dots sequential on both engines
    (see sim_topk_cosine_lsh's oracle for the reproducibility argument)."""
    from esgopeta_spark.operators.similarity import _hyperplanes

    n_tables, n_planes, seed = 8, 4, 7
    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(64, n_planes, seed + 1000 * t)
        bits = []
        for i, p in enumerate(planes):
            arr = "[" + ",".join(repr(x) for x in p) + "]"
            bits.append(f"(CASE WHEN list_dot_product(v, {arr}) >= 0 THEN {2 ** i} ELSE 0 END)")
        buckets.append("(" + " + ".join(bits) + ")")
    ba = "[" + ", ".join(buckets) + "]"
    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS MATERIALIZED (SELECT vec_id, v, {ba} AS ba FROM c),
    ae AS (SELECT vec_id, v, ba, t.t AS t, ba[t.t + 1] AS b
           FROM cb CROSS JOIN generate_series(0, {n_tables - 1}) t(t)),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
      FROM ae a JOIN ae b ON a.t = b.t AND a.b = b.b AND a.vec_id < b.vec_id
      WHERE list_position(list_transform(range(1, {n_tables + 1}),
                                         i -> a.ba[i] = b.ba[i]), true) = a.t + 1),
    scored AS (
      SELECT id_a, id_b,
             list_dot_product(va, vb)
               / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))) AS cs
      FROM cand)
    SELECT id_a, id_b, CAST(floor(cs * 1000000 + 0.5) AS BIGINT) AS cosine_micro
    FROM scored WHERE cs >= 0.4
    """


@register(
    "dedup_embedding_lsh",
    "G2",
    _emb_lsh_oracle(),
    doc="embedding-cosine near-dup, hyperplane-LSH tier (bucket equi-join self-pair, "
    "exact cosine verify) — the linear-cost 100 TB path for the same predicate; "
    "4 planes x 8 tables sized for this data's 0.4 threshold (arccos(0.4)~66deg -> "
    "0.16/table -> ~75%% recall; production near-dup thresholds >=0.9 use deeper planes).  "
    "r6: FULL-PIPELINE oracle (inlined plane constants + sequential-order bucket dots, "
    "same technique as sim_topk_cosine_lsh) — the bucketed pair set and micro-cosines "
    "hash-match exactly; recall vs the exact tier stays pinned in pytest",
)
def dedup_embedding_lsh(spark, sf):
    from esgopeta_spark.operators.similarity import embedding_dup_pairs_lsh

    emb = T(spark, sf, "embeddings")
    out = embedding_dup_pairs_lsh(emb, threshold=0.4, dim=64, n_planes=4, n_tables=8)
    return out.select(
        "id_a", "id_b", F.floor(F.col("cosine_sim") * 1000000.0 + 0.5).cast("bigint").alias("cosine_micro")
    ).orderBy("id_a", "id_b")


@register(
    "sim_topk_cosine_ivf",
    "G3",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id % 25 = 0),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, cents.cell,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                 list_dot_product(c.v, cents.cv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                 cents.cell ASC) AS rn
        FROM c CROSS JOIN cents) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id % 50 = 0),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, cents.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 list_dot_product(q.qv, cents.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                 cents.cell ASC) AS rk
        FROM q CROSS JOIN cents) WHERE rk <= 3),
    scored AS (
      SELECT p.query_id, a.vec_id AS nbr_id,
             list_dot_product(p.qv, a.v)
               / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS cosine_sim
      FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.query_id),
    r AS (SELECT query_id, nbr_id, cosine_sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, nbr_id) AS rank
          FROM scored)
    SELECT query_id, nbr_id,
           CAST(floor(cosine_sim * 1000000 + 0.5) AS BIGINT) AS cosine_micro, rank
    FROM r WHERE rank <= 5
    """,
    doc="IVF-flat approximate top-5 cosine: deterministic strided codebook, argmax cell "
    "assignment against broadcast centroids, n_probe-cell probe join.  Unlike the "
    "hyperplane-LSH twin this IS oracle-checkable: every float op is a sequential "
    "left-fold with identical operand order on both engines (rule 2), so cell "
    "assignment, probe choice and final ranks match bitwise",
)
def sim_topk_cosine_ivf(spark, sf):
    from esgopeta_spark.operators.similarity import topk_cosine_ivf

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    out = topk_cosine_ivf(emb, queries, dim=64, k=5, centroid_stride=25, n_probe=3)
    return out.select(
        "query_id",
        "nbr_id",
        F.floor(F.col("cosine_sim") * 1000000.0 + 0.5).cast("bigint").alias("cosine_micro"),
        "rank",
    )


@register(
    "sim_topk_cosine_ivf_kmeans",
    "G3",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents0 AS (SELECT vec_id AS cell, v AS cv FROM c WHERE vec_id % 25 = 0),
    asg1 AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, cents0.cell,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                 list_dot_product(c.v, cents0.cv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(cents0.cv, cents0.cv))) DESC,
                 cents0.cell ASC) AS rn
        FROM c CROSS JOIN cents0) WHERE rn = 1),
    upd1 AS (
      SELECT cell, t.d,
             CAST(CAST(SUM(CAST(floor(v[t.d] * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                  // COUNT(*) AS DOUBLE) / 1000000.0 AS mv
      FROM asg1, generate_series(1, 64) t(d)
      GROUP BY cell, t.d),
    cents1 AS (
      SELECT c0.cell, COALESCE(u.cv, c0.cv) AS cv
      FROM cents0 c0 LEFT JOIN (
        SELECT cell, list(mv ORDER BY d) AS cv FROM upd1 GROUP BY cell) u USING (cell)),
    asg2 AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, cents1.cell,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                 list_dot_product(c.v, cents1.cv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(cents1.cv, cents1.cv))) DESC,
                 cents1.cell ASC) AS rn
        FROM c CROSS JOIN cents1) WHERE rn = 1),
    upd2 AS (
      SELECT cell, t.d,
             CAST(CAST(SUM(CAST(floor(v[t.d] * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                  // COUNT(*) AS DOUBLE) / 1000000.0 AS mv
      FROM asg2, generate_series(1, 64) t(d)
      GROUP BY cell, t.d),
    cents2 AS (
      SELECT c1.cell, COALESCE(u.cv, c1.cv) AS cv
      FROM cents1 c1 LEFT JOIN (
        SELECT cell, list(mv ORDER BY d) AS cv FROM upd2 GROUP BY cell) u USING (cell)),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, cents2.cell,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                 list_dot_product(c.v, cents2.cv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(cents2.cv, cents2.cv))) DESC,
                 cents2.cell ASC) AS rn
        FROM c CROSS JOIN cents2) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id % 50 = 0),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, cents2.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 list_dot_product(q.qv, cents2.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cents2.cv, cents2.cv))) DESC,
                 cents2.cell ASC) AS rk
        FROM q CROSS JOIN cents2) WHERE rk <= 3),
    scored AS (
      SELECT p.query_id, a.vec_id AS nbr_id,
             list_dot_product(p.qv, a.v)
               / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS cosine_sim
      FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.query_id),
    r AS (SELECT query_id, nbr_id, cosine_sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, nbr_id) AS rank
          FROM scored)
    SELECT query_id, nbr_id,
           CAST(floor(cosine_sim * 1000000 + 0.5) AS BIGINT) AS cosine_micro, rank
    FROM r WHERE rank <= 5
    """,
    doc="IVF-flat top-5 over a k-means-TRAINED codebook — the full "
    "production train->assign->probe pipeline, still hash-exact vs DuckDB: "
    "centroid updates are component means in integer micro-units (exact, "
    "order-free sums; both engines truncate integer division toward zero), "
    "so two full k-means iterations reproduce bitwise cross-engine.  "
    "Measured on sf0.001: trained codebook tightens mean max-cosine "
    "quantization 0.264 -> 0.345 vs the strided sample",
)
def sim_topk_cosine_ivf_kmeans(spark, sf):
    from esgopeta_spark.operators.similarity import topk_cosine_ivf_trained

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = topk_cosine_ivf_trained(emb, queries, dim=64, k=5, init_stride=25, n_iter=2, n_probe=3)
    return out.select(
        "query_id",
        "nbr_id",
        F.floor(F.col("cosine_sim") * 1000000.0 + 0.5).cast("bigint").alias("cosine_micro"),
        "rank",
    )


@register(
    "q4_late_shipment_priority",
    "E2,E3,E4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (adapted to this schema: late = shipped >60d after order): "
    "correlated EXISTS with a non-equi residual == left-semi hash join + filter",
)
def q4_late_shipment_priority(spark, sf):
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q14_promo_revenue",
    "E3,E4",
    """
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) * (1 - CAST(0 AS DECIMAL(4,2))) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
    """,
    doc="TPC-H Q14 shape: conditional aggregate ratio (promo revenue share); decimal-exact "
    "sums, double division only at the end (rule 1); part dim broadcasts",
)
def q14_promo_revenue(spark, sf):
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    p = T(spark, sf, "part").select("p_partkey", "p_type")
    disc_price = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)") * (F.lit(1) - F.lit(0).cast("decimal(4,2)"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(zero)).cast("double")
            / F.sum(disc_price).cast("double")
        ).alias("promo_pct")
    )


@register(
    "q18_large_orders",
    "E3,E4",
    """
    WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
                 HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 280)
    SELECT c_name, c_custkey, o_orderkey,
           CAST(floor(o_totalprice * 1000000 + 0.5) AS BIGINT) AS totalprice_micro,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: HAVING-filtered aggregate as IN-subquery (left-semi), "
    "re-aggregated over the 3-way join; unique total order for the LIMIT (rule 4)",
)
def q18_large_orders(spark, sf):
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 280)
        .select("l_orderkey")
    )
    o = T(spark, sf, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    c = T(spark, sf, "customer").select("c_custkey", "c_name")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(money("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 1000000.0 + 0.5).cast("bigint").alias("totalprice_micro"),
            "sum_qty",
        )
    )


@register(
    "dedup_embedding_components",
    "G2,A1",
    """
    WITH RECURSIVE
    emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
    e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
    reach(s, t) AS (
      SELECT a, a FROM e
      UNION
      SELECT r.s, e.b FROM reach r JOIN e ON r.t = e.a
    )
    SELECT s AS id, MIN(t) AS comp FROM reach GROUP BY s
    """,
    doc="near-dup pairs clustered into canonical groups: connected components by "
    "iterative min-label propagation (operators/dedup.py dup_components); the DuckDB "
    "oracle is the same closure as a recursive CTE",
)
def dedup_embedding_components(spark, sf):
    from esgopeta_spark.operators.dedup import dup_components
    from esgopeta_spark.operators.similarity import embedding_dup_pairs_exact

    emb = T(spark, sf, "embeddings")
    pairs = embedding_dup_pairs_exact(emb, threshold=0.4, dim=64)
    return dup_components(pairs).select("id", "comp")


@register(
    "stream_join_attribution",
    "F1,E3",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us,
           CAST(floor(c.value * 1000000 + 0.5) AS BIGINT) AS click_value_micro
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY
    """,
    doc="stream-stream interval join (batch form graded here; batch==stream equivalence "
    "in test_streaming): purchases joined to same-user clicks within a 1-day lookback; "
    "watermarked two-sided time bound gives streaming state a hard eviction horizon",
)
def stream_join_attribution(spark, sf):
    from esgopeta_spark.streaming.joins import purchase_click_attribution

    ev = T(spark, sf, "events")
    return purchase_click_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        lookback="1 day",
    )


@register(
    "skew_salted_agg",
    "E4",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="skew-safe two-phase salted aggregate (operators/skew.py): hot keys split over "
    "16 deterministic salts then re-merged — graded bit-identical to the plain GROUP BY "
    "oracle (decimal partials are algebraic, so the split is exact, not approximate)",
)
def skew_salted_agg(spark, sf):
    from esgopeta_spark.operators.skew import salted_aggregate

    li = T(spark, sf, "lineitem").select(
        "l_returnflag",
        money("l_quantity").alias("_qty"),
        money("l_extendedprice").alias("_price"),
    )
    out = salted_aggregate(
        li, keys=["l_returnflag"],
        sum_cols={"_qty": "sum_qty_dec", "_price": "sum_price_dec"},
        count_alias="n_items",
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        F.col("sum_price_dec").cast("double").alias("sum_price"),
        "n_items",
    )


@register(
    "set_exceptall_multiline_orders",
    "E7",
    """
    SELECT l_orderkey FROM lineitem
    EXCEPT ALL
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL (multiset difference): lineitem order keys minus one occurrence per "
    "finished order — exercises the bag semantics distinct-based set ops can't express",
)
def set_exceptall_multiline_orders(spark, sf):
    li = T(spark, sf, "lineitem").select("l_orderkey")
    o = T(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return li.exceptAll(o)


@register(
    "multimodal_features",
    "G5",
    None,  # mapInPandas decode/feature kernels are not SQL-expressible; the
    # pixel-feature math is pytest-oracled (test_llm_ops multimodal_pipeline:
    # analytic gradient-image means; codec round-trips in test_codecs)
    doc="multimodal binary-column pipeline on the REAL decode path (r9: stub "
    "kernels retired): deterministic bmp/ppm/png/jpeg/gif corpus -> "
    "decode_media (from-scratch codecs) -> extract_image_features pixel "
    "statistics (channel means, luma mean/std, edge energy) -> join + "
    "micro-unit projection",
)
def multimodal_features(spark, sf):
    from esgopeta_spark.operators.multimodal import (
        decode_media,
        extract_image_features,
        synthetic_media_real,
    )

    media = synthetic_media_real(spark, 64)
    decoded = decode_media(media).filter(F.col("ok") & F.col("width").isNotNull())
    feats = extract_image_features(media)
    return (
        decoded.join(feats, "media_id")
        .select(
            "media_id",
            "format",
            "width",
            "height",
            F.floor(F.element_at("feature", 4).cast("double") * 1000000.0 + 0.5)
            .cast("bigint")
            .alias("luma_mean_micro"),
            F.floor(F.element_at("feature", 6).cast("double") * 1000000.0 + 0.5)
            .cast("bigint")
            .alias("edge_energy_micro"),
        )
        .orderBy("media_id")
    )


@register(
    "dedup_ngram_jaccard",
    "G2",
    """
    WITH d AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents WHERE doc_id % 25 = 0
    ),
    g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               list_zip(w[1:len(w)-2], w[2:len(w)-1], w[3:len(w)]),
               r -> r[1] || ' ' || r[2] || ' ' || r[3])) AS grams
      FROM d
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(floor(
             CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                  THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.grams, b.grams)))
                  ELSE 0.0 END * 1000000 + 0.5) AS BIGINT)
             AS jaccard_micro
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    """,
    doc="exact word-3-gram Jaccard over a deterministic id-strided doc sample "
    "(operators/dedup.py ngram_jaccard; Spark computes it over 64-bit gram hashes — "
    "set-equal to string grams modulo hash collisions — the oracle over the strings "
    "themselves); this is the G2 verify primitive graded standalone",
)
def dedup_ngram_jaccard(spark, sf):
    from esgopeta_spark.operators.dedup import ngram_jaccard

    d = T(spark, sf, "documents")
    sample = d.filter(F.col("doc_id") % 25 == 0)
    ids = sample.select(F.col("doc_id").alias("_i"))
    pairs = (
        ids.select(F.col("_i").alias("id_a"))
        .join(ids.select(F.col("_i").alias("id_b")), F.col("id_a") < F.col("id_b"))
    )
    out = ngram_jaccard(pairs, sample, text_col="text", id_col="doc_id", n=3)
    return out.select(
        "id_a", "id_b",
        F.floor(F.col("jaccard") * 1000000.0 + 0.5).cast("bigint").alias("jaccard_micro"),
    )


@register(
    "skew_salted_join",
    "E3",
    """
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="skew-safe salted replicated join (operators/skew.py salted_broadcast_join): "
    "the big side salts on a deterministic row hash, the dim side replicates once per "
    "salt, the join keys on (key, salt) — a hot part key splits across 8 tasks instead "
    "of one straggler; graded bit-identical to the plain-join oracle",
)
def skew_salted_join(spark, sf):
    from esgopeta_spark.operators.skew import salted_broadcast_join

    li = T(spark, sf, "lineitem").select("l_partkey", money("l_extendedprice").alias("_price"))
    p = T(spark, sf, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    j = salted_broadcast_join(li, p, key="l_partkey", n_salts=8)
    return j.groupBy("p_brand").agg(
        F.sum("_price").cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "multimodal_decode_real",
    "G5",
    None,  # binary decode is not SQL-expressible; round-trip oracles live in
    # tests/test_codecs.py (encode->decode identity, resize pixel math,
    # sine-wave RMS theory)
    doc="REAL multimodal decode pipeline: deterministic BMP/PPM/WAV corpus -> "
    "mapInPandas pure-numpy decode (operators/codecs.py) -> per-kind meta + "
    "audio RMS micro-units; compressed rows surface err='needs-codec' instead "
    "of failing the stage",
)
def multimodal_decode_real(spark, sf):
    from esgopeta_spark.operators.multimodal import (
        decode_media,
        extract_audio_features,
        synthetic_media_real,
    )

    media = synthetic_media_real(spark, 64)
    decoded = decode_media(media)
    audio = extract_audio_features(media).select(
        "media_id", F.floor(F.col("rms") * 1000000.0 + 0.5).cast("bigint").alias("rms_micro")
    )
    return (
        decoded.join(audio, "media_id", "left")
        .select("media_id", "format", "ok", "err", "width", "height", "sample_rate", "duration_ms", "rms_micro")
        .orderBy("media_id")
    )


@register(
    "emb_label_centroids",
    "G5,E4,E8",
    """
    WITH e AS (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings)
    SELECT label, CAST(dim AS INTEGER) AS dim,
           CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
           COUNT(*) AS n
    FROM e GROUP BY label, dim
    """,
    doc="exact distributed per-label embedding centroids: posexplode to "
    "(label, dim, value), per-component integer micro-unit sums (order-free, "
    "rule 1/3) + counts — the caller divides for the mean; the embedding-hygiene "
    "aggregation (centroids for IVF codebooks, label drift checks) with NO float "
    "summation nondeterminism at any parallelism",
)
def emb_label_centroids(spark, sf):
    emb = T(spark, sf, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim0", "v"))
        .select(
            "label",
            (F.col("dim0") + 1).cast("int").alias("dim"),  # 1-based like the oracle
            F.floor(F.col("v").cast("double") * 1000000.0 + 0.5).cast("bigint").alias("vm"),
        )
        .groupBy("label", "dim")
        .agg(F.sum("vm").cast("bigint").alias("sum_micro"), F.count("*").alias("n"))
    )


@register(
    "dedup_semantic_kmeans",
    "G2,G3",
    """
    WITH RECURSIVE
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents0 AS (SELECT vec_id AS cell, v AS cv FROM c WHERE vec_id % 25 = 0),
    asg1 AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, cents0.cell,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                 list_dot_product(c.v, cents0.cv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(cents0.cv, cents0.cv))) DESC,
                 cents0.cell ASC) AS rn
        FROM c CROSS JOIN cents0) WHERE rn = 1),
    upd1 AS (
      SELECT cell, t.d,
             CAST(CAST(SUM(CAST(floor(v[t.d] * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                  // COUNT(*) AS DOUBLE) / 1000000.0 AS mv
      FROM asg1, generate_series(1, 64) t(d)
      GROUP BY cell, t.d),
    cents1 AS (
      SELECT c0.cell, COALESCE(u.cv, c0.cv) AS cv
      FROM cents0 c0 LEFT JOIN (
        SELECT cell, list(mv ORDER BY d) AS cv FROM upd1 GROUP BY cell) u USING (cell)),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT c.vec_id, c.v, cents1.cell,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                 list_dot_product(c.v, cents1.cv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(cents1.cv, cents1.cv))) DESC,
                 cents1.cell ASC) AS rn
        FROM c CROSS JOIN cents1) WHERE rn = 1),
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE CAST(floor(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
              * 1000000 + 0.5) AS BIGINT) >= 400000),
    e AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
    reach(s, t) AS (
      SELECT a, a FROM e
      UNION
      SELECT r.s, e.b FROM reach r JOIN e ON r.t = e.a),
    comp AS (SELECT s AS id, MIN(t) AS comp FROM reach GROUP BY s)
    SELECT a.vec_id, a.cell, COALESCE(cm.comp, a.vec_id) AS keeper,
           CAST(CASE WHEN cm.comp IS NOT NULL AND cm.comp <> a.vec_id
                     THEN 1 ELSE 0 END AS INTEGER) AS is_dup
    FROM assigned a LEFT JOIN comp cm ON a.vec_id = cm.id
    """,
    doc="SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540): "
    "k-means-cluster the embeddings (1 trained iteration, integer micro-unit "
    "centroid means = engine-exact), then near-dup pairs ONLY within a cluster "
    "(O(sum (n/k)^2), the trick that makes embedding dedup feasible at 100 TB), "
    "min-label connected components, one verdict row per vector "
    "(cell, keeper, is_dup).  The duplicate test compares integer micro-cosines "
    "so no float boundary flips membership cross-engine (catalog rule 2)",
)
def dedup_semantic_kmeans(spark, sf):
    from esgopeta_spark.operators.similarity import semantic_dedup

    emb = T(spark, sf, "embeddings")
    return semantic_dedup(
        emb, dim=64, threshold_micro=400000, init_stride=25, n_iter=1
    )


@register(
    "dedup_substring_spans",
    "G1,G2,G4",
    """
    WITH d AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             CAST(CAST(('0x' || substr(md5(array_to_string(w[i : i + 7], ' ')), 1, 15))
                  AS UBIGINT) AS BIGINT) AS gkey
      FROM (SELECT doc_id, w, UNNEST(range(1, len(w) - 6)) AS i
            FROM d WHERE len(w) >= 8)),
    shared AS (
      SELECT gkey FROM g GROUP BY gkey HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT g.doc_id,
           COUNT(*) AS n_dup_windows,
           COUNT(DISTINCT g.gkey) AS n_dup_grams,
           MIN(g.pos) AS first_dup_pos
    FROM g JOIN shared USING (gkey)
    GROUP BY g.doc_id
    """,
    doc="verbatim cross-document span detection (exact-substring dedup, Lee et "
    "al. 2022 arXiv:2107.06499): positioned word-8-gram windows, grams shared "
    "by >=2 distinct docs, per-doc duplicated-span stats — catches literal "
    "repeated passages (boilerplate, licence blocks, templated spam) that "
    "document-level MinHash misses inside otherwise-unique docs.  One "
    "gram-keyed partial-agg shuffle + a broadcast of the small shared-gram "
    "set back onto the gram stream (operators/dedup.py duplicated_ngram_spans)",
)
def dedup_substring_spans(spark, sf):
    from esgopeta_spark.operators.dedup import duplicated_ngram_spans

    d = T(spark, sf, "documents")
    out = duplicated_ngram_spans(d, n=8, min_docs=2)
    return out.select(
        "doc_id",
        "n_dup_windows",
        "n_dup_grams",
        F.col("first_dup_pos").cast("bigint").alias("first_dup_pos"),
    )


# shared CTE prefix for the two span-extraction oracles: positioned word
# 8-grams (60-bit md5 keys, identical to the Spark side), shared set,
# gaps-and-islands merge of overlapping/adjacent windows into spans
_SPAN_CTES = """
    WITH d AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             CAST(CAST(('0x' || substr(md5(array_to_string(w[i : i + 7], ' ')), 1, 15))
                  AS UBIGINT) AS BIGINT) AS gkey
      FROM (SELECT doc_id, w, UNNEST(range(1, len(w) - 6)) AS i
            FROM d WHERE len(w) >= 8)),
    shared AS (
      SELECT gkey FROM g GROUP BY gkey HAVING COUNT(DISTINCT doc_id) >= 2),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS brk
      FROM (SELECT g.doc_id, g.pos,
                   MAX(g.pos + 8) OVER (PARTITION BY g.doc_id ORDER BY g.pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
            FROM g JOIN shared USING (gkey))),
    sp AS (
      SELECT doc_id, span_id, MIN(pos) AS start_word, MAX(pos) + 8 AS end_word,
             COUNT(*) AS n_windows
      FROM (SELECT doc_id, pos,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
            FROM isl)
      GROUP BY doc_id, span_id)
"""


@register(
    "dedup_span_extract",
    "G1,G2,G4,E5",
    _SPAN_CTES
    + """
    SELECT sp.doc_id, CAST(sp.span_id AS BIGINT) AS span_id,
           CAST(sp.start_word AS BIGINT) AS start_word,
           CAST(sp.end_word AS BIGINT) AS end_word,
           CAST(CASE WHEN sp.start_word = 0 THEN 0
                ELSE len(array_to_string(d.w[1 : sp.start_word], ' ')) + 1
                END AS BIGINT) AS start_char,
           CAST(len(array_to_string(d.w[1 : sp.end_word], ' ')) AS BIGINT) AS end_char,
           CAST(sp.n_windows AS BIGINT) AS n_windows
    FROM sp JOIN d USING (doc_id)
    """,
    doc="span EXTRACTION for exact-substring dedup (the Lee et al. 2022 "
    "removal prerequisite, arXiv:2107.06499): overlapping/adjacent duplicated "
    "8-gram windows merge into maximal (doc_id, start, end) ranges in both "
    "word and char coordinates of the normalized text — one gaps-and-islands "
    "window over the dup-position stream, no self-join "
    "(operators/dedup.py duplicated_span_ranges); integer-exact so the "
    "DuckDB oracle hash-matches",
)
def dedup_span_extract(spark, sf):
    from esgopeta_spark.operators.dedup import duplicated_span_ranges

    return duplicated_span_ranges(T(spark, sf, "documents"), n=8, min_docs=2)


@register(
    "dedup_span_removal",
    "G1,G2,G4,E5",
    _SPAN_CTES
    + """
    , wpos AS (
      SELECT doc_id, i - 1 AS p, w[i] AS word
      FROM (SELECT doc_id, w, UNNEST(range(1, len(w) + 1)) AS i FROM d)),
    drop_p AS (
      SELECT doc_id, UNNEST(range(start_word, end_word)) AS p FROM sp),
    kept AS (
      SELECT wpos.doc_id, wpos.p, wpos.word
      FROM wpos LEFT JOIN drop_p
        ON wpos.doc_id = drop_p.doc_id AND wpos.p = drop_p.p
      WHERE drop_p.p IS NULL),
    agg AS (
      SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id),
    spn AS (
      SELECT doc_id, COUNT(*) AS n_spans,
             SUM(end_word - start_word) AS n_removed
      FROM sp GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(agg.clean_text, '') AS clean_text,
           CAST(COALESCE(spn.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(spn.n_removed, 0) AS BIGINT) AS n_removed_words,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept_words
    FROM d LEFT JOIN agg USING (doc_id) LEFT JOIN spn USING (doc_id)
    """,
    doc="the exact-substring CLEANING pass (Lee et al. 2022): every word "
    "inside a duplicated span dropped, survivors re-joined — one row per "
    "input doc with the cleaned normalized text and removal counts.  Spans "
    "collapse to one bounded array per doc joined LEFT onto the corpus; the "
    "word filter is a JVM-side higher-order filter with an index lambda, no "
    "python and no re-explode (operators/dedup.py remove_duplicated_spans)",
)
def dedup_span_removal(spark, sf):
    from esgopeta_spark.operators.dedup import remove_duplicated_spans

    return remove_duplicated_spans(T(spark, sf, "documents"), n=8, min_docs=2)


def _pack_oracle() -> str:
    from esgopeta_spark.operators.text import TOKEN_REGEX

    return f"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               '{TOKEN_REGEX}')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM d)
    SELECT source, CAST((cum - n_tok) // 2048 AS BIGINT) AS seq_bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_used,
           MIN(doc_id) AS first_doc
    FROM c GROUP BY source, seq_bin
    """


@register(
    "corpus_pack_sequences",
    "G4,E5,E4",
    _pack_oracle(),
    doc="deterministic sequence packing into 2048-token training windows "
    "(operators/text.py pack_sequences): per-source id-ordered token cumsum "
    "assigns each doc to the window where it starts — all-integer streaming-"
    "packer layout, reproducible at any parallelism (vs. greedy best-fit whose "
    "output depends on arrival order); per-(source, window) doc/token rollup",
)
def corpus_pack_sequences(spark, sf):
    from esgopeta_spark.operators.text import pack_sequences

    return pack_sequences(T(spark, sf, "documents"), window_tokens=2048)


@register(
    "quality_audit_orders",
    "E4,E2,E3",
    """
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v0,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS v1,
             CAST(SUM(CASE WHEN o_orderpriority LIKE '_-%' THEN 0 ELSE 1 END) AS BIGINT) AS v2,
             CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v3
      FROM orders),
    long AS (
      SELECT 'totalprice_positive' AS check_name, n, v0 AS v FROM base
      UNION ALL SELECT 'status_domain', n, v1 FROM base
      UNION ALL SELECT 'priority_format', n, v2 FROM base
      UNION ALL SELECT 'custkey_not_null', n, v3 FROM base
      UNION ALL
      SELECT 'custkey_in_customer',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
              LEFT JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_custkey IS NULL))
    SELECT check_name, n AS n_rows, v AS n_violations,
           CAST(CASE WHEN n > 0 THEN (v * 1000000) // n ELSE 0 END AS BIGINT) AS violation_ppm
    FROM long
    """,
    doc="declarative data-quality audit (operators/quality.py, the Deequ/dbt-test "
    "shape): four row-validity predicates folded into ONE partial-aggregated scan "
    "of orders (never one scan per constraint) plus a referential "
    "custkey-in-customer check as one anti-join; long-form per-constraint "
    "violation counts with integer ppm rates",
)
def quality_audit_orders(spark, sf):
    from esgopeta_spark.operators.quality import constraint_audit, referential_audit

    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    table_checks = constraint_audit(
        o,
        {
            "totalprice_positive": F.col("o_totalprice") > 0,
            "status_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "priority_format": F.col("o_orderpriority").like("_-%"),
            "custkey_not_null": F.col("o_custkey").isNotNull(),
        },
    )
    ref = referential_audit(o, c, "o_custkey", "c_custkey", "custkey_in_customer")
    return table_checks.unionByName(ref)


def _pack_pipeline_oracle() -> str:
    from esgopeta_spark.operators.text import TOKEN_REGEX

    return f"""
    WITH n AS (
      SELECT doc_id, source,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    keep AS (  -- stage 1: exact dedup, lowest doc_id per normalized text
      SELECT MIN(doc_id) AS doc_id FROM n GROUP BY norm),
    d AS (
      SELECT n.doc_id, n.source,
             CASE WHEN length(n.norm) = 0 THEN [] ELSE string_split(n.norm, ' ') END AS words,
             CAST(len(regexp_extract_all(n.norm, '{TOKEN_REGEX}')) AS BIGINT) AS n_tok
      FROM n JOIN keep ON n.doc_id = keep.doc_id),
    g AS (  -- stage 2: quality gate
      SELECT doc_id, source, n_tok FROM d WHERE len(words) >= 10),
    c AS (  -- stage 3: id-ordered token cumsum per source
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM g)
    SELECT source, CAST((cum - n_tok) // 2048 AS BIGINT) AS seq_bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_used,
           MIN(doc_id) AS first_doc
    FROM c GROUP BY source, seq_bin
    """


@register(
    "pipeline_pack_training_shards",
    "G1,G4,E4,E5",
    _pack_pipeline_oracle(),
    doc="the COMPLETE training-data prep chain in one Catalyst plan: exact-"
    "dedup keepers (G1, sha2 grouping) -> token-count quality gate (G4) -> "
    "deterministic sequence packing into 2048-token shard windows (per-source "
    "id-ordered cumsum) -> per-(source, window) rollup.  The semi-join keeper "
    "prune runs before tokenization, the gate before the window shuffle, so "
    "each stage's cost tracks its survivor set — the corpus-to-shards "
    "pipeline a 100 TB run would execute, end to end, hash-exact",
)
def pipeline_pack_training_shards(spark, sf):
    from esgopeta_spark.operators.dedup import exact_dedup
    from esgopeta_spark.operators.text import pack_sequences, token_count

    d = T(spark, sf, "documents")
    keepers = exact_dedup(d)
    survivors = d.join(keepers, "doc_id", "left_semi")
    gated = survivors.filter(token_count(F.col("text")) >= 10)
    return pack_sequences(gated, window_tokens=2048)


@register(
    "bpe_vocab_merges",
    "G4",
    None,  # the merge sequence is an iterative artifact, not SQL-expressible;
    # pinned against a pure-python BPE reference in test_llm_ops
    doc="distributed BPE tokenizer training (operators/bpe.py, Sennrich et "
    "al. 2016): one corpus scan builds the distinct-word frequency table, "
    "then each of 10 merge rounds is a pair-count partial-agg shuffle over "
    "that small table + a deterministic (count DESC, pair ASC) argmax + an "
    "Arrow merge kernel.  Emits the learned merge sequence (rank, left, "
    "right, weighted count) — the vocabulary artifact a tokenizer ships; "
    "rows-only by design, reference-checked in pytest",
)
def bpe_vocab_merges(spark, sf):
    from esgopeta_spark.operators.bpe import bpe_train

    merges = bpe_train(T(spark, sf, "documents"), n_merges=10)
    return spark.createDataFrame(
        [(i, l, r, w) for i, (l, r, w) in enumerate(merges)],
        "rank int, left string, right string, weight bigint",
    )


@register(
    "bpe_doc_token_counts",
    "G4",
    None,  # downstream of the iterative merge artifact; reference-checked
    # (merge sequence == pure-python BPE) in test_llm_ops
    doc="tokenize the corpus with the learned BPE vocabulary "
    "(operators/bpe.py bpe_segment_counts): rank-greedy merge application "
    "per word inside one Arrow kernel, no shuffle; per-doc BPE token and "
    "char counts — the compression ratio a tokenizer team watches.  "
    "Rows-only: the counts depend on the iterative merge artifact",
)
def bpe_doc_token_counts(spark, sf):
    from esgopeta_spark.operators.bpe import bpe_segment_counts, bpe_train

    d = T(spark, sf, "documents")
    merges = bpe_train(d, n_merges=10)
    return bpe_segment_counts(d, merges)


# ---------------------------------------------------------------------------
# Product quantization (G3 compressed-domain tier, round 5) — both the code
# assignment and the full ADC top-k are exact integer arithmetic, so DuckDB
# replicates them bit-for-bit.  The 8-term unrolled subspace expressions are
# generated here once (m=8 subspaces of 8 dims, ks=16 seed centroids).
# ---------------------------------------------------------------------------

_PQ_DIST_TERMS = " + ".join(
    f"(c.vm[s.s*8+{i}]-cent.vm[s.s*8+{i}])*(c.vm[s.s*8+{i}]-cent.vm[s.s*8+{i}])"
    for i in range(1, 9)
)
_PQ_DOT_TERMS = " + ".join(
    f"q.vm[s.s*8+{i}]*cent.vm[s.s*8+{i}]" for i in range(1, 9)
)
_PQ_BASE_SQL = f"""
    c AS (SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x*1000000+0.5) AS BIGINT)) AS vm
          FROM embeddings),
    cent AS (SELECT vec_id AS cid, vm FROM c WHERE vec_id < 16),
    s AS (SELECT UNNEST(range(0, 8)) AS s),
    d AS (SELECT c.vec_id, s.s, cent.cid, {_PQ_DIST_TERMS} AS dist
          FROM c CROSS JOIN s CROSS JOIN cent),
    code AS (SELECT vec_id, s, cid FROM (
               SELECT vec_id, s, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                         ORDER BY dist ASC, cid ASC) AS rn
               FROM d) WHERE rn = 1)
"""


@register(
    "sim_pq_codes",
    "G3,G5",
    "WITH " + _PQ_BASE_SQL + """
    SELECT vec_id AS id,
           CAST(SUM(cid * CAST(power(16, s) AS BIGINT)) AS BIGINT) AS packed_code
    FROM code GROUP BY vec_id
    """,
    doc="product-quantization encode (Jégou et al. 2011): 64-dim vectors "
    "compress to 8 sub-codes (nearest of 16 seed sub-centroids per 8-dim "
    "subspace, exact int64 micro-unit distances, ties to smallest id), "
    "emitted packed base-16 for the scalar-output rule.  One Arrow "
    "mapInPandas pass over the corpus, KB codebook in the kernel closure "
    "(operators/similarity.pq_encode)",
)
def sim_pq_codes(spark, sf):
    from esgopeta_spark.operators.similarity import pq_encode

    codes = pq_encode(T(spark, sf, "embeddings"), dim=64, m=8, ks=16)
    packed = None
    for s in range(8):
        term = F.element_at("codes", s + 1).cast("bigint") * F.lit(16**s).cast("bigint")
        packed = term if packed is None else packed + term
    return codes.select("id", packed.alias("packed_code"))


@register(
    "sim_topk_ip_pq",
    "G3",
    "WITH " + _PQ_BASE_SQL + f""",
    q AS (SELECT vec_id AS query_id, vm FROM c WHERE vec_id % 50 = 0),
    lut AS (SELECT q.query_id, s.s, cent.cid, {_PQ_DOT_TERMS} AS dotv
            FROM q CROSS JOIN s CROSS JOIN cent),
    sc AS (SELECT lut.query_id, code.vec_id AS nbr_id,
                  CAST(SUM(lut.dotv) AS BIGINT) AS score_micro2
           FROM code JOIN lut ON code.s = lut.s AND code.cid = lut.cid
           GROUP BY 1, 2)
    SELECT query_id, nbr_id, score_micro2, rank FROM (
      SELECT query_id, nbr_id, score_micro2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_micro2 DESC, nbr_id ASC) AS rank
      FROM sc)
    WHERE rank <= 5
    """,
    doc="top-k inner product via PQ asymmetric distance computation: per-query "
    "LUT of subspace-centroid dots (broadcast, exact int64), corpus scanned as "
    "8 codes with the score an 8-term codegen'd array-lookup sum — the "
    "original vectors never enter the scoring stage.  The compressed-domain "
    "tier between IVF cells and exact rerank at 100 TB "
    "(operators/similarity.topk_ip_pq; PQ+rerank recall pinned in pytest)",
)
def sim_topk_ip_pq(spark, sf):
    from esgopeta_spark.operators.similarity import topk_ip_pq

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_ip_pq(emb, queries, dim=64, k=5, m=8, ks=16)


@register(
    "sim_topk_ivfpq",
    "G3",
    "WITH "
    + """c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(floor(x*1000000+0.5) AS BIGINT)) AS vmfull
           FROM embeddings),
    cents AS (SELECT vec_id AS cell, v AS cv FROM c0 WHERE vec_id % 25 = 0),
    assigned AS (
      SELECT vec_id, cell FROM (
        SELECT c0.vec_id, cents.cell,
               ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
                 list_dot_product(c0.v, cents.cv)
                   / (sqrt(list_dot_product(c0.v, c0.v)) * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                 cents.cell ASC) AS rn
        FROM c0 CROSS JOIN cents) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv, vmfull AS qm
          FROM c0 WHERE vec_id % 50 = 0),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, cents.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 list_dot_product(q.qv, cents.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                 cents.cell ASC) AS rk
        FROM q CROSS JOIN cents) WHERE rk <= 3),
    c AS (SELECT vec_id, vmfull AS vm FROM c0),
    cent AS (SELECT vec_id AS cid, vmfull AS vm FROM c0 WHERE vec_id < 16),
    s AS (SELECT UNNEST(range(0, 8)) AS s),
    d AS (SELECT c.vec_id, s.s, cent.cid, """
    + _PQ_DIST_TERMS
    + """ AS dist
          FROM c CROSS JOIN s CROSS JOIN cent),
    code AS (SELECT vec_id, s, cid FROM (
               SELECT vec_id, s, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                         ORDER BY dist ASC, cid ASC) AS rn
               FROM d) WHERE rn = 1),
    lut AS (SELECT q2.query_id, s.s, cent.cid, """
    + " + ".join(f"q2.qm[s.s*8+{i}]*cent.vm[s.s*8+{i}]" for i in range(1, 9))
    + """ AS dotv
            FROM (SELECT query_id, qm FROM q) q2 CROSS JOIN s CROSS JOIN cent),
    adc AS (SELECT p.query_id, a.vec_id AS nbr_id,
                   CAST(SUM(l.dotv) AS BIGINT) AS score
            FROM probes p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN code ON code.vec_id = a.vec_id
            JOIN lut l ON l.query_id = p.query_id AND l.s = code.s AND l.cid = code.cid
            GROUP BY 1, 2),
    cand AS (SELECT query_id, nbr_id FROM (
               SELECT query_id, nbr_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, nbr_id ASC) AS rk
               FROM adc) WHERE rk <= 20),
    ex AS (SELECT cand.query_id, cand.nbr_id,
                  CAST(floor(list_dot_product(q.qv, cv.v) * 1000000000000 + 0.5) AS BIGINT) AS ip_micro12
           FROM cand JOIN q USING (query_id)
           JOIN c0 cv ON cv.vec_id = cand.nbr_id)
    SELECT query_id, nbr_id, ip_micro12, rank FROM (
      SELECT query_id, nbr_id, ip_micro12,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ip_micro12 DESC, nbr_id ASC) AS rank
      FROM ex) WHERE rank <= 5
    """,
    doc="IVF-PQ composed ANN (r11, verdict #5 — the billion-vector "
    "layout): coarse IVF cell probe (bit-exact float-fold argmax "
    "against the broadcast strided codebook, n_probe=3) narrows the "
    "corpus, PQ asymmetric distance ranks WITHIN the probed cells from "
    "the compressed codes (exact int64 micro-unit LUT sums), and the "
    "top-20 ADC candidates rerank by exact inner product (micro^12 "
    "floor) to the final top-5.  Both component tiers are already "
    "graded (sim_topk_cosine_ivf, sim_topk_ip_pq); the composition "
    "keeps every stage engine-exact so the full pipeline hash-matches.  "
    "Plan: two shuffle-free Arrow corpus passes + id-equi pairing, "
    "broadcast per-query probe/LUT rows, CELL-equi ADC join (the key a "
    "billion-vector index partitions by), narrow projection before the "
    "windows, vectors re-touched only rerank-deep; "
    "operators/similarity.py topk_ip_ivfpq",
)
def sim_topk_ivfpq(spark, sf):
    from esgopeta_spark.operators.similarity import topk_ip_ivfpq

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_ip_ivfpq(
        emb, queries, dim=64, k=5, m=8, ks=16,
        centroid_stride=25, n_probe=3, rerank=20,
    )


@register(
    "sim_topk_ip_sq8",
    "G3",
    r"""
    WITH c AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x*1000000+0.5) AS BIGINT)) AS vm
      FROM embeddings),
    dv AS (
      SELECT vec_id, UNNEST(vm) AS val, UNNEST(range(1, len(vm) + 1)) AS d
      FROM c),
    mm AS (SELECT d, min(val) AS mn, max(val) AS mx FROM dv GROUP BY d),
    code AS (
      SELECT dv.vec_id, dv.d, mm.mn, mm.mx,
             CASE WHEN mm.mx > mm.mn
                  THEN ((dv.val - mm.mn) * 255) // (mm.mx - mm.mn)
                  ELSE 0 END AS cd
      FROM dv JOIN mm USING (d)),
    q AS (SELECT vec_id AS query_id, d, val AS qv FROM dv WHERE vec_id % 50 = 0),
    s AS (
      SELECT q.query_id, code.vec_id AS nbr_id,
             CAST(SUM(q.qv * (code.mn * 255 + code.cd * (code.mx - code.mn)))
                  AS BIGINT) AS score_scaled
      FROM q JOIN code ON q.d = code.d
      GROUP BY 1, 2),
    r AS (
      SELECT query_id, nbr_id, score_scaled,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_scaled DESC, nbr_id ASC) AS rank
      FROM s)
    SELECT query_id, nbr_id, score_scaled, CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= 5
    """,
    doc="SQ8 scalar-quantization top-k (r11 — the byte-per-dimension "
    "tier between PQ codes and exact float, faiss's SQ8): per-dim "
    "affine codes ((v-min)*255 fdiv range over the corpus per-dim "
    "min/max, exact int64 micro-units, non-negative numerators so "
    "floor==truncate on every engine), asymmetric scoring 255*dot(q,"
    "min) + dot(q*range, code) as an EXACT integer matmul (integer "
    "ops are order-independent — no float-order caveat), ties to the "
    "smallest id.  Oracle recomputes minmax/codes/scores identically.  "
    "Plan: one minmax aggregate (2*dim ints collected), one encode "
    "pass, one scoring pass that emits only per-batch per-query top-k "
    "(tournament top-k: the global winner set is a subset of "
    "per-batch winners under the same order), final window over "
    "batches*Q*k candidates — the corpus never shuffles, vectors "
    "never move; operators/similarity.py sq8_encode/topk_ip_sq8",
)
def sim_topk_ip_sq8(spark, sf):
    from esgopeta_spark.operators.similarity import topk_ip_sq8

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_ip_sq8(emb, queries, dim=64, k=5)


@register(
    "stream_join_attribution_outer",
    "F1,E3",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us,
           CASE WHEN c.value IS NOT NULL
                THEN CAST(floor(c.value * 1000000 + 0.5) AS BIGINT) END
             AS click_value_micro,
           CAST(CASE WHEN c.ts IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
             AS attributed
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY
    """,
    doc="LEFT OUTER stream-stream interval join (r11 — the attribution "
    "shape that also reports NON-converted purchases, the conversion-"
    "rate denominator; batch form graded here, watermark-expiry "
    "null-emission pinned batch==stream in test_streaming): unmatched "
    "purchases emit once with null click fields and attributed=0.  On "
    "a stream the null row can only emit once the right watermark "
    "passes the window end — the case that NEEDS the watermark; the "
    "two-sided event-time bound stays the state-eviction horizon; "
    "streaming/joins.py interval_join_outer",
)
def stream_join_attribution_outer(spark, sf):
    from esgopeta_spark.streaming.joins import purchase_click_attribution_outer

    ev = T(spark, sf, "events")
    return purchase_click_attribution_outer(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        lookback="1 day",
    )


@register(
    "sim_topk_ivfsq8",
    "G3",
    r"""
    WITH c0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x*1000000+0.5) AS BIGINT)) AS vm
      FROM embeddings),
    cents AS (SELECT vec_id AS cell, v AS cv FROM c0 WHERE vec_id % 25 = 0),
    assigned AS (
      SELECT vec_id, cell FROM (
        SELECT c0.vec_id, cents.cell,
               ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
                 list_dot_product(c0.v, cents.cv)
                   / (sqrt(list_dot_product(c0.v, c0.v)) * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                 cents.cell ASC) AS rn
        FROM c0 CROSS JOIN cents) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv, vm AS qm
          FROM c0 WHERE vec_id % 50 = 0),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, cents.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 list_dot_product(q.qv, cents.cv)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                 cents.cell ASC) AS rk
        FROM q CROSS JOIN cents) WHERE rk <= 3),
    dv AS (
      SELECT vec_id, UNNEST(vm) AS val, UNNEST(range(1, len(vm) + 1)) AS d
      FROM c0),
    mm AS (SELECT d, min(val) AS mn, max(val) AS mx FROM dv GROUP BY d),
    code AS (
      SELECT dv.vec_id, dv.d, mm.mn, mm.mx,
             CASE WHEN mm.mx > mm.mn
                  THEN ((dv.val - mm.mn) * 255) // (mm.mx - mm.mn)
                  ELSE 0 END AS cd
      FROM dv JOIN mm USING (d)),
    qd AS (
      SELECT query_id, UNNEST(qm) AS qv_d, UNNEST(range(1, len(qm) + 1)) AS d
      FROM q),
    adc AS (
      SELECT p.query_id, a.vec_id AS nbr_id,
             CAST(SUM(qd.qv_d * (code.mn * 255 + code.cd * (code.mx - code.mn)))
                  AS BIGINT) AS score
      FROM probes p
      JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN code ON code.vec_id = a.vec_id
      JOIN qd ON qd.query_id = p.query_id AND qd.d = code.d
      GROUP BY 1, 2),
    cand AS (SELECT query_id, nbr_id FROM (
               SELECT query_id, nbr_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, nbr_id ASC) AS rk
               FROM adc) WHERE rk <= 20),
    ex AS (SELECT cand.query_id, cand.nbr_id,
                  CAST(floor(list_dot_product(q.qv, cv.v) * 1000000000000 + 0.5) AS BIGINT) AS ip_micro12
           FROM cand JOIN q USING (query_id)
           JOIN c0 cv ON cv.vec_id = cand.nbr_id)
    SELECT query_id, nbr_id, ip_micro12, rank FROM (
      SELECT query_id, nbr_id, ip_micro12,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ip_micro12 DESC, nbr_id ASC) AS rank
      FROM ex) WHERE rank <= 5
    """,
    doc="IVF-SQ8 composed ANN (r11 — the OTHER memory-tier layout "
    "beside IVF-PQ, faiss IVFxx,SQ8): coarse IVF cell probe (bit-exact "
    "float-fold argmax, n_probe=3) narrows the corpus, SQ8 asymmetric "
    "reconstruction scores WITHIN the probed cells from byte codes "
    "(finer than PQ at 8x the code size — the recall/memory dial; "
    "exact integer arithmetic end to end), top-20 candidates rerank by "
    "exact inner product (micro^12 floor) to the final top-5.  All "
    "three component tiers already graded (sim_topk_cosine_ivf, "
    "sim_topk_ip_sq8, the PQ rerank tail); the composition stays "
    "hash-exact.  Plan: two shuffle-free Arrow corpus passes + id-equi "
    "pairing; minmax artifact + per-query probe/weight rows broadcast; "
    "CELL-equi ADC join with the integer dot as one Arrow kernel over "
    "narrow pairs; only rerank-deep candidates touch vectors again; "
    "operators/similarity.py topk_ip_ivfsq8",
)
def sim_topk_ivfsq8(spark, sf):
    from esgopeta_spark.operators.similarity import topk_ip_ivfsq8

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_ip_ivfsq8(emb, queries, dim=64, k=5)


def _pack_mask_oracle() -> str:
    from esgopeta_spark.operators.text import TOKEN_REGEX

    return f"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(regexp_extract_all(
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
               '{TOKEN_REGEX}')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM d),
    b AS (
      SELECT source, n_tok, (cum - n_tok) // 2048 AS seq_bin,
             CASE WHEN n_tok > 0 AND (cum - 1) // 2048 <> (cum - n_tok) // 2048
                  THEN 1 ELSE 0 END AS straddle
      FROM c),
    r AS (
      SELECT source, CAST(seq_bin AS BIGINT) AS seq_bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS tokens_used,
             CAST(MAX(n_tok) AS BIGINT) AS max_doc_tokens,
             CAST(SUM(straddle) AS BIGINT) AS n_straddle,
             CAST(GREATEST(2048 - SUM(n_tok), 0) AS BIGINT) AS pad_tokens
      FROM b GROUP BY source, seq_bin)
    SELECT source, seq_bin, n_docs, tokens_used, max_doc_tokens,
           n_straddle, pad_tokens,
           CAST((pad_tokens * 1000) // 2048 AS BIGINT) AS waste_milli
    FROM r
    """


@register(
    "corpus_pack_mask_spans",
    "G4,E5,E4",
    _pack_mask_oracle(),
    doc="attention-mask metadata of the packed layout (r12 — what a "
    "doc-masked trainer needs beyond pack_sequences' window "
    "assignment): per (source, window) the largest single-doc span "
    "(attention block bound), the straddling-doc count (the carry the "
    "tokenizer must split), the padding a non-carrying writer burns "
    "and its integer waste rate.  Same all-integer cumsum layout and "
    "single source-keyed window shuffle as pack_sequences; "
    "operators/text.py pack_mask_spans",
)
def corpus_pack_mask_spans(spark, sf):
    from esgopeta_spark.operators.text import pack_mask_spans

    return pack_mask_spans(T(spark, sf, "documents"), window_tokens=2048)


@register(
    "mine_bitext_margin",
    "G3,G4",
    """
    WITH s AS (SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS sv
               FROM embeddings WHERE vec_id % 2 = 0),
         t AS (SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS tv
               FROM embeddings WHERE vec_id % 2 = 1),
         p AS (SELECT src_id, tgt_id,
                      list_dot_product(sv, tv)
                        / (sqrt(list_dot_product(sv, sv))
                           * sqrt(list_dot_product(tv, tv))) AS c
               FROM s, t),
         r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY src_id
                                    ORDER BY c DESC, tgt_id) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY tgt_id
                                    ORDER BY c DESC, src_id) AS rb
               FROM p),
         fa AS (SELECT src_id,
                       ((MAX(CASE WHEN rf = 1 THEN c END)
                         + COALESCE(MAX(CASE WHEN rf = 2 THEN c END), 0.0))
                        + COALESCE(MAX(CASE WHEN rf = 3 THEN c END), 0.0))
                       + COALESCE(MAX(CASE WHEN rf = 4 THEN c END), 0.0) AS fs,
                       COUNT(*) AS fn
                FROM r WHERE rf <= 4 GROUP BY src_id),
         fb AS (SELECT tgt_id,
                       ((MAX(CASE WHEN rb = 1 THEN c END)
                         + COALESCE(MAX(CASE WHEN rb = 2 THEN c END), 0.0))
                        + COALESCE(MAX(CASE WHEN rb = 3 THEN c END), 0.0))
                       + COALESCE(MAX(CASE WHEN rb = 4 THEN c END), 0.0) AS bs,
                       COUNT(*) AS bn
                FROM r WHERE rb <= 4 GROUP BY tgt_id),
         m AS (SELECT p.src_id, p.tgt_id, p.c,
                      (p.c * 2.0) / ((fa.fs / fa.fn) + (fb.bs / fb.bn)) AS mg
               FROM p JOIN fa USING (src_id) JOIN fb USING (tgt_id)),
         mm AS (SELECT *,
                  ROW_NUMBER() OVER (PARTITION BY src_id
                                     ORDER BY mg DESC, tgt_id) AS bf,
                  ROW_NUMBER() OVER (PARTITION BY tgt_id
                                     ORDER BY mg DESC, src_id) AS bb
                FROM m)
    SELECT src_id, tgt_id,
           CAST(floor(c * 1000000 + 0.5) AS BIGINT) AS cosine_micro,
           CAST(floor(mg * 1000 + 0.5) AS BIGINT) AS margin_milli
    FROM mm
    WHERE bf = 1 AND bb = 1 AND floor(mg * 1000 + 0.5) >= 1050
    """,
    doc="margin-based bitext mining (r13 — the CCMatrix/WikiMatrix "
    "step that pairs sentences across languages for translation-"
    "capable pretraining; Artetxe & Schwenk 2019 ratio margin): sides "
    "= even/odd vec_ids, margin = cos / mean of both sides' k-NN "
    "cosines (k=4), pairs kept when MUTUAL-best by margin and margin "
    ">= 1.05 — plain nearest-neighbor pairing over-collects hub "
    "vectors; the denominator normalizes neighborhood density away.  "
    "Hash-exact: sequential-order double cosines (the sim_* idiom), "
    "avgK as a FIXED-ORDER sum of rank-slot maxes (never a float agg "
    "whose order the partitioning picks), margin as one expression.  "
    "Plan: broadcast bipartite score relation narrowed to 3 columns "
    "before any shuffle, four natural-key windows; at 100 TB the "
    "score relation composes with IVF cell assignment instead (the "
    "candidate generation CCMatrix itself uses); "
    "operators/similarity.py mine_bitext_margin",
)
def mine_bitext_margin(spark, sf):
    from esgopeta_spark.operators.similarity import mine_bitext_margin as mine

    emb = T(spark, sf, "embeddings")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    return mine(src, tgt, dim=64)


_UFOLD_SUFFIXES = [
    "",  # class 0: clean (pins the no-false-positive side)
    " ‘quoted’ “em—dash–set” and −5",  # typographic class
    " ＦＵＬＬＷＩＤＴＨ　ｔｅｘｔ１２３！",  # width class
    " ﬁﬂ…so­ft​hy‌phen ¼+½=¾⁄x",  # ligature/invisible class
]


def _ufold_oracle():
    from esgopeta_spark.operators.text import unicode_fold_sql

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    suffix = ("CASE " + " ".join(
        f"WHEN doc_id % 4 = {k} THEN {q(s)}"
        for k, s in enumerate(_UFOLD_SUFFIXES)) + " END")
    return f"""
    WITH c AS (
      SELECT doc_id, coalesce(text, '') || {suffix} AS t FROM documents
    )
    SELECT doc_id,
           {unicode_fold_sql('t')} AS folded,
           CAST(CASE WHEN {unicode_fold_sql('t')} <> t THEN 1 ELSE 0 END
                AS INTEGER) AS changed
    FROM c
    """


@register(
    "text_unicode_fold",
    "G4",
    _ufold_oracle(),
    doc="bounded Unicode compatibility fold, NFKC-lite (r13 — the "
    "C4/ftfy-lineage normalization between mojibake repair and "
    "tokenization): curly quotes/dashes/minus to ASCII, the NBSP/thin/"
    "ideographic space family to space, the FULLWIDTH ASCII block to "
    "halfwidth, soft hyphens + zero-widths DROPPED, fi/fl ligatures + "
    "ellipsis + fraction forms expanded.  Full NFKC needs the Unicode "
    "tables; bounding the map to the classes web prose actually "
    "carries is what makes the fold ORACLE-SHARED — BOTH engines' "
    "expressions are GENERATED from the one constant table "
    "(text.FOLD_1TO1/FOLD_DROP/FOLD_1TON), so a drifted entry fails "
    "the hash.  Fixture plants a suffix per id%4 class (clean / "
    "typographic / fullwidth / ligature+invisible); 'changed' pins the "
    "clean class reads 0.  Plan: one translate + fixed replace chain, "
    "pure codegen, no shuffle; stateless (streams as-is); idempotence "
    "fuzz-pinned; operators/text.py unicode_fold/unicode_fold_sql",
)
def text_unicode_fold(spark, sf):
    from esgopeta_spark.operators.text import fold_unicode

    did = F.col("doc_id")
    suffix = F.lit(None).cast("string")
    for k, s in enumerate(_UFOLD_SUFFIXES):
        suffix = F.when(did % 4 == k, F.lit(s)).otherwise(suffix)
    d = T(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), suffix).alias("text"),
    )
    return fold_unicode(d)


@register(
    "mine_bitext_margin_ivf",
    "G3,G4",
    """
    WITH s AS (SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS sv
               FROM embeddings WHERE vec_id % 2 = 0),
         t AS (SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS tv
               FROM embeddings WHERE vec_id % 2 = 1),
         cents AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings WHERE vec_id % 25 = 0),
         a_s AS (
           SELECT src_id, sv, cell FROM (
             SELECT s.src_id, s.sv, cents.cell,
                    ROW_NUMBER() OVER (PARTITION BY s.src_id ORDER BY
                      list_dot_product(s.sv, cents.cv)
                        / (sqrt(list_dot_product(s.sv, s.sv))
                           * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                      cents.cell ASC) AS rn
             FROM s CROSS JOIN cents) WHERE rn = 1),
         a_t AS (
           SELECT tgt_id, tv, cell FROM (
             SELECT t.tgt_id, t.tv, cents.cell,
                    ROW_NUMBER() OVER (PARTITION BY t.tgt_id ORDER BY
                      list_dot_product(t.tv, cents.cv)
                        / (sqrt(list_dot_product(t.tv, t.tv))
                           * sqrt(list_dot_product(cents.cv, cents.cv))) DESC,
                      cents.cell ASC) AS rn
             FROM t CROSS JOIN cents) WHERE rn = 1),
         p AS (SELECT a_s.src_id, a_t.tgt_id,
                      list_dot_product(a_s.sv, a_t.tv)
                        / (sqrt(list_dot_product(a_s.sv, a_s.sv))
                           * sqrt(list_dot_product(a_t.tv, a_t.tv))) AS c
               FROM a_s JOIN a_t ON a_s.cell = a_t.cell),
         r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY src_id
                                    ORDER BY c DESC, tgt_id) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY tgt_id
                                    ORDER BY c DESC, src_id) AS rb
               FROM p),
         fa AS (SELECT src_id,
                       ((MAX(CASE WHEN rf = 1 THEN c END)
                         + COALESCE(MAX(CASE WHEN rf = 2 THEN c END), 0.0))
                        + COALESCE(MAX(CASE WHEN rf = 3 THEN c END), 0.0))
                       + COALESCE(MAX(CASE WHEN rf = 4 THEN c END), 0.0) AS fs,
                       COUNT(*) AS fn
                FROM r WHERE rf <= 4 GROUP BY src_id),
         fb AS (SELECT tgt_id,
                       ((MAX(CASE WHEN rb = 1 THEN c END)
                         + COALESCE(MAX(CASE WHEN rb = 2 THEN c END), 0.0))
                        + COALESCE(MAX(CASE WHEN rb = 3 THEN c END), 0.0))
                       + COALESCE(MAX(CASE WHEN rb = 4 THEN c END), 0.0) AS bs,
                       COUNT(*) AS bn
                FROM r WHERE rb <= 4 GROUP BY tgt_id),
         m AS (SELECT p.src_id, p.tgt_id, p.c,
                      (p.c * 2.0) / ((fa.fs / fa.fn) + (fb.bs / fb.bn)) AS mg
               FROM p JOIN fa USING (src_id) JOIN fb USING (tgt_id)),
         mm AS (SELECT *,
                  ROW_NUMBER() OVER (PARTITION BY src_id
                                     ORDER BY mg DESC, tgt_id) AS bf,
                  ROW_NUMBER() OVER (PARTITION BY tgt_id
                                     ORDER BY mg DESC, src_id) AS bb
                FROM m)
    SELECT src_id, tgt_id,
           CAST(floor(c * 1000000 + 0.5) AS BIGINT) AS cosine_micro,
           CAST(floor(mg * 1000 + 0.5) AS BIGINT) AS margin_milli
    FROM mm
    WHERE bf = 1 AND bb = 1 AND floor(mg * 1000 + 0.5) >= 1050
    """,
    doc="bitext mining, IVF SCALE tier (r13): the exact ratio-margin "
    "miner's candidate generation replaced by coarse-cell bucketing — "
    "both sides argmax-assigned to a deterministic strided codebook "
    "drawn from their union (assign_cells Arrow kernel, bit-identical "
    "to the join argmax), pairs generated per CELL via a hash-equi "
    "join (never the bipartite broadcast cross — per-pair work is "
    "|cell_src| x |cell_tgt|, the shape CCMatrix mines 100 TB with), "
    "kNN averages over what the cell offers (fixed-order coalesce "
    "sums / actual counts).  The whole APPROXIMATE pipeline is "
    "hash-exact vs DuckDB — the approximation is in the algorithm, "
    "not the execution (the IVF top-k discipline); "
    "operators/similarity.py mine_bitext_margin_ivf",
)
def mine_bitext_margin_ivf(spark, sf):
    from esgopeta_spark.operators.similarity import (
        mine_bitext_margin_ivf as mine,
    )

    emb = T(spark, sf, "embeddings")
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    return mine(src, tgt, dim=64)
