"""TPC-H depth, part 2: the remaining classic query shapes expressible
on this slimmed schema (no partsupp; no l_shipmode/commitdate/receiptdate,
so Q12/Q21 lateness is adapted to ship-vs-order date).  Same determinism
rules as catalog.py (see its module docstring).

Reference parity note: the reference (cretz/esgopeta, /root/reference)
has no relational surface at all (SURVEY.md §2 Group E is driver-mandated);
these queries exercise SURVEY rows E2-E4/E6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from esgopeta_spark.plans.catalog import T, money, pct, register


@register(
    "q7_volume_shipping",
    "E3,E4,E8",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair volume by ship year; both nation "
    "dims broadcast, disjunctive pair predicate applied post-join on broadcast side",
)
def q7_volume_shipping(spark, sf):
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    n = T(spark, sf, "nation").select("n_nationkey", "n_name")
    # pre-restrict both nation dims to the pair before joining: the
    # restriction reaches the broadcast build side, so supplier/customer
    # rows outside the two nations are dropped at the (tiny) dim join
    n_pair = n.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    s = (
        T(spark, sf, "supplier")
        .join(F.broadcast(n_pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        T(spark, sf, "customer")
        .join(F.broadcast(n_pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    vol = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    return (
        j.select("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"), vol.alias("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    "E3,E4",
    """
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(12,2)) * (1 - CAST(0 AS DECIMAL(4,2))) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
             n1.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share of ECONOMY parts sold into ASIA, "
    "by order year; part/supplier/nation/region dims broadcast, conditional-sum ratio "
    "with decimal-exact numerator and denominator (rule 1)",
)
def q8_market_share(spark, sf):
    p = T(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = T(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount")
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    s = (
        T(spark, sf, "supplier")
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    asia_cust = (
        T(spark, sf, "customer")
        .join(
            F.broadcast(
                n.select("n_nationkey", "n_regionkey").join(
                    F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    vol = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    zero = F.lit(0).cast("decimal(12,2)") * (F.lit(1) - F.lit(0).cast("decimal(4,2)"))
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(asia_cust, o.o_custkey == asia_cust.c_custkey)
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    return j.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).cast("double").alias("mkt_share")
    )


@register(
    "q13_customer_distribution",
    "E3,E4",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: order-count-per-customer histogram; left outer join with a "
    "pushed build-side residual predicate, then a double aggregation (second one tiny)",
)
def q13_customer_distribution(spark, sf):
    c = T(spark, sf, "customer").select("c_custkey")
    o = T(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    "E2,E3,E4",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE)
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND p_size < 10
      AND l_quantity < 0.2 * (
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape (p_size stands in for p_container): correlated per-part average "
    "quantity as a pre-aggregated join (shuffle on l_partkey), decimal-exact avg (rule 1); "
    "the brand filter broadcasts so the per-part agg only runs over surviving parts",
)
def q17_small_quantity_revenue(spark, sf):
    p = T(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = T(spark, sf, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    # restrict lineitem to surviving parts FIRST (broadcast semi): the
    # correlated avg only needs those parts' rows
    li_p = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
    avg_q = li_p.groupBy("l_partkey").agg(
        (F.sum(money("l_quantity")).cast("double") / F.count("*")).alias("_avg_qty")
    )
    j = li_p.join(F.broadcast(avg_q), "l_partkey").filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("_avg_qty")
    )
    return j.agg(
        (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).cast("double").alias("avg_yearly")
    )


@register(
    "q19_disjunctive_revenue",
    "E2,E3,E4",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of (brand, size, quantity) bands; per-side implied "
    "prefilters (brand IN (...), quantity in hull) are added redundantly so pushdown "
    "reaches both scans even though the OR itself spans the join",
)
def q19_disjunctive_revenue(spark, sf):
    # redundant single-table hulls of the disjunction -> pushed to scans
    p = T(spark, sf, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#15", "Brand#18") & (F.col("p_size") <= 35)
    ).select("p_partkey", "p_brand", "p_size")
    li = T(spark, sf, "lineitem").filter(F.col("l_quantity").between(1, 30)).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#18") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    rev = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    return j.agg(F.sum(rev).cast("double").alias("revenue"))


@register(
    "q12_shipmode_priority",
    "E2,E3,E4",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape adapted to this schema (no l_shipmode/commitdate/"
    "receiptdate: return flag stands in for ship mode, late = shipped >30d "
    "after order): priority split via conditional integer counts, one "
    "shuffle-join on orderkey then a 3-group aggregate; all-integer "
    "outputs so the hash is engine-exact",
)
def q12_shipmode_priority(spark, sf):
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    o = T(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
    )


@register(
    "q21_waiting_supplier",
    "E2,E3,E4",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (late = shipped >60d after order, no receipt/commit dates in "
    "schema): sole-late-supplier detection via ONE per-order aggregate (distinct supplier "
    "count + distinct late-supplier count) instead of two correlated EXISTS scans — "
    "one shuffle on orderkey replaces the double self-join",
)
def q21_waiting_supplier(spark, sf):
    o = T(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late"),
    )
    n1 = T(spark, sf, "nation").filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    s = (
        T(spark, sf, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    waiting = (
        lo.filter(F.col("_late"))
        .join(per_order.filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)), "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return waiting.groupBy("s_name").agg(F.count("*").alias("numwait"))


@register(
    "q22_sales_opportunity",
    "E2,E3,E4",
    """
    SELECT n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_5','NATION_6','NATION_7','NATION_8','NATION_9')
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    """,
    doc="TPC-H Q22 shape (nation list stands in for phone country codes; 'no orders' "
    "tightened to 'no orders since 2000' so the result is non-empty on this data): "
    "scalar subquery (global positive-balance average) broadcast as a 1-row cross "
    "join, NOT EXISTS as left-anti against date-filtered orders",
)
def q22_sales_opportunity(spark, sf):
    c = T(spark, sf, "customer")
    n = T(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7", "NATION_8", "NATION_9")
    ).select("n_nationkey", "n_name")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count("*")).alias("_avg_bal")
    )
    o = T(spark, sf, "orders").filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    eligible = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return eligible.groupBy("n_name").agg(
        F.count("*").alias("numcust"),
        F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
    )


@register(
    "q15_top_supplier",
    "E3,E4",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: quarterly revenue view per supplier, select the max-revenue "
    "supplier(s) via a scalar subquery; decimal-exact sums (rule 1) make the max "
    "comparison deterministic cross-engine",
)
def q15_top_supplier(spark, sf):
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(money("l_extendedprice") * (F.lit(1) - pct("l_discount"))).alias("_rev")
    )
    max_rev = revenue.agg(F.max("_rev").alias("_mx"))
    s = T(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("_rev") == F.col("_mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the testdata ships no partsupp table, which blocked
# q2/q9/q11/q16/q20 (COVERAGE.md boundary note).  Both engines DERIVE the
# same relation with dbgen's own supplier-assignment shape (TPC-H spec
# 4.2.3 / dbgen build.c: part i gets 4 suppliers at stride S/4 + i/S,
# adapted to this data's 0-based contiguous keys) and deterministic
# integer availqty/supplycost — every column is exact integer arithmetic,
# so the derivation is bit-identical cross-engine and the five classic
# query shapes become expressible as labeled adaptations.
# ---------------------------------------------------------------------------

_PS_SQL = """
    scnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM supplier),
    ps_raw AS (
      SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
             (CAST(p_partkey AS BIGINT) + k.k * (scnt.cnt // 4 + CAST(p_partkey AS BIGINT) // scnt.cnt)) % scnt.cnt AS ps_suppkey,
             (CAST(p_partkey AS BIGINT) * 7 + k.k * 11) % 9999 + 1 AS ps_availqty,
             (CAST(p_partkey AS BIGINT) * 13 + k.k * 17) % 99900 + 100 AS ps_supplycost_cent,
             k.k AS slot_k
      FROM part, scnt, (SELECT UNNEST(range(0, 4)) AS k) k),
    ps AS (
      -- dbgen guarantees 4 DISTINCT suppliers per part; the stride can
      -- collide mod supplier-count when it shares a factor with it, so
      -- dedup per (part, supplier) keeping the lowest slot (min-k is a
      -- total order: deterministic, unlike bare DISTINCT-on-subset)
      SELECT ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cent
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY ps_partkey, ps_suppkey
                                         ORDER BY slot_k) AS _rn
            FROM ps_raw)
      WHERE _rn = 1)
"""


def _partsupp(spark, sf):
    """Spark twin of _PS_SQL: 4 deterministic supplier slots per part,
    deduped per (part, supplier) on the lowest slot — the stride can
    collide mod supplier-count (r4 ADVICE), and dbgen's real partsupp
    never repeats a pair."""
    from pyspark.sql.window import Window

    p = T(spark, sf, "part").select(F.col("p_partkey").cast("bigint").alias("ps_partkey"))
    scnt = T(spark, sf, "supplier").agg(F.count("*").cast("bigint").alias("_scnt"))
    raw = (
        p.crossJoin(F.broadcast(scnt))  # 1-row scalar, broadcast by construction
        .select("ps_partkey", "_scnt", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("_k"))
        .select(
            "ps_partkey",
            (
                (F.col("ps_partkey") + F.col("_k") * (F.expr("_scnt div 4") + F.expr("ps_partkey div _scnt")))
                % F.col("_scnt")
            ).alias("ps_suppkey"),
            ((F.col("ps_partkey") * 7 + F.col("_k") * 11) % 9999 + 1).alias("ps_availqty"),
            ((F.col("ps_partkey") * 13 + F.col("_k") * 17) % 99900 + 100).alias("ps_supplycost_cent"),
            F.col("_k"),
        )
    )
    w = Window.partitionBy("ps_partkey", "ps_suppkey").orderBy("_k")
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost_cent")
    )


@register(
    "q2_min_cost_supplier",
    "E3,E4,E2",
    "WITH " + _PS_SQL + """,
    costs AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost_cent
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    mins AS (SELECT ps_partkey, MIN(ps_supplycost_cent) AS min_cost
             FROM costs GROUP BY ps_partkey)
    SELECT p.p_partkey, p.p_brand, p.p_type, s.s_name, n.n_name,
           CAST(CAST(s.s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS s_acctbal,
           c.ps_supplycost_cent AS supplycost_cent,
           c.ps_suppkey
    FROM part p
    JOIN mins m ON p.p_partkey = m.ps_partkey
    JOIN costs c ON c.ps_partkey = m.ps_partkey AND c.ps_supplycost_cent = m.min_cost
    JOIN supplier s ON c.ps_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size % 5 = 0
    ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, c.ps_suppkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape on the DERIVED partsupp (see _PS_SQL note): cheapest "
    "in-region supplier per part — per-part MIN + join-back on the min cost, "
    "dims broadcast; integer-cent costs make the min and the tie join exact; "
    "ORDER BY carries ps_suppkey so the LIMIT cut is a total order by key",
)
def q2_min_cost_supplier(spark, sf):
    ps = _partsupp(spark, sf)
    s = T(spark, sf, "supplier")
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    p = T(spark, sf, "part").filter(F.col("p_size") % 5 == 0)
    costs = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost_cent")
    )
    mins = costs.groupBy("ps_partkey").agg(F.min("ps_supplycost_cent").alias("_min_cost"))
    return (
        p.join(mins, p.p_partkey == mins.ps_partkey)
        .join(
            costs.withColumnRenamed("ps_partkey", "_cpk"),
            (F.col("_cpk") == F.col("p_partkey")) & (F.col("ps_supplycost_cent") == F.col("_min_cost")),
        )
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "p_partkey", "p_brand", "p_type", "s_name", "n_name",
            money("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("ps_supplycost_cent").alias("supplycost_cent"),
            "ps_suppkey",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "ps_suppkey")
        .limit(100)
    )


@register(
    "q9_product_profit",
    "E3,E4,E8",
    "WITH " + _PS_SQL + """,
    joined AS (
      SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT) AS rev_e4,
             ps.ps_supplycost_cent * CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS cost_e4
      FROM lineitem l
      JOIN ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE p.p_type = 'STANDARD')
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(SUM(rev_e4 - cost_e4) AS BIGINT) AS profit_e4
    FROM joined GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape on the DERIVED partsupp: per-nation per-year product "
    "profit (discounted revenue minus supply cost) for one part type.  All "
    "money flows through exact integer 1e-4-currency units (decimal scale-4 "
    "revenue and cent*centi-quantity cost), so the profit sum is order-free "
    "and hash-exact; the ps join keeps only lineitems whose (part, supplier) "
    "pair exists in the derived relation — the documented adaptation",
)
def q9_product_profit(spark, sf):
    ps = _partsupp(spark, sf)
    li = T(spark, sf, "lineitem")
    p = T(spark, sf, "part").filter(F.col("p_type") == "STANDARD")
    s = T(spark, sf, "supplier")
    n = T(spark, sf, "nation")
    o = T(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    rev_e4 = (
        (money("l_extendedprice") * (F.lit(1) - pct("l_discount")) * 10000).cast("bigint")
    )
    cost_e4 = F.col("ps_supplycost_cent") * (money("l_quantity") * 100).cast("bigint")
    return (
        li.join(ps, (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (rev_e4 - cost_e4).alias("_pe4"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("_pe4").cast("bigint").alias("profit_e4"))
    )


@register(
    "q11_important_stock",
    "E4,E2",
    "WITH " + _PS_SQL + """,
    german AS (
      SELECT ps_partkey, ps_supplycost_cent * ps_availqty AS v_cent
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
      WHERE s_nationkey = 3),
    tot AS (SELECT CAST(SUM(v_cent) AS BIGINT) AS t,
                   CAST(COUNT(DISTINCT ps_partkey) AS BIGINT) AS np FROM german)
    SELECT g.ps_partkey, CAST(SUM(g.v_cent) AS BIGINT) AS value_cent
    FROM german g, tot
    GROUP BY g.ps_partkey, tot.t, tot.np
    HAVING CAST(SUM(g.v_cent) AS BIGINT) * tot.np > tot.t * 2
    """,
    doc="TPC-H Q11 shape on the DERIVED partsupp: per-part inventory value "
    "held by one nation's suppliers, kept when above 2x the nation's MEAN "
    "per-part value — the classic agg-vs-global-scalar HAVING.  The spec's "
    "fixed fraction is SF-scaled (0.0001/SF) precisely because a constant "
    "threshold empties as the part count grows; value*n_parts > 2*total is "
    "the scale-free equivalent, and all-integer so the boundary is exact "
    "(catalog rule 2)",
)
def q11_important_stock(spark, sf):
    ps = _partsupp(spark, sf)
    s = T(spark, sf, "supplier").filter(F.col("s_nationkey") == 3)
    german = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .select("ps_partkey", (F.col("ps_supplycost_cent") * F.col("ps_availqty")).alias("_v"))
    )
    tot = german.agg(
        F.sum("_v").cast("bigint").alias("_t"),
        F.countDistinct("ps_partkey").cast("bigint").alias("_np"),
    )
    return (
        german.groupBy("ps_partkey")
        .agg(F.sum("_v").cast("bigint").alias("value_cent"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("value_cent") * F.col("_np") > F.col("_t") * 2)
        .select("ps_partkey", "value_cent")
    )


@register(
    "q16_supplier_cnt",
    "E4,E2,E3",
    "WITH " + _PS_SQL + """
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape on the DERIVED partsupp: distinct supplier counts "
    "per (brand, type, size) bucket, excluding one brand, a size set, and "
    "negative-balance suppliers (the complaints NOT-IN adapted to the slim "
    "schema's columns)",
)
def q16_supplier_cnt(spark, sf):
    ps = _partsupp(spark, sf)
    p = T(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = T(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("_bad")
    )
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == F.col("_bad"), "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_availability",
    "E3,E4,E2",
    "WITH " + _PS_SQL + """,
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS sq_cent
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM ps
    JOIN shipped q ON ps.ps_partkey = q.l_partkey AND ps.ps_suppkey = q.l_suppkey
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    WHERE s.s_nationkey = 7
      AND ps.ps_availqty * 200 > q.sq_cent
    """,
    doc="TPC-H Q20 shape on the DERIVED partsupp: suppliers in one nation "
    "holding more than half a year's shipped quantity of some part "
    "(availqty*200 > 100*sum(qty), the 0.5 threshold in exact integer "
    "centi-units); semi-style DISTINCT projection after the availability "
    "probe join",
)
def q20_excess_availability(spark, sf):
    ps = _partsupp(spark, sf)
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum(money("l_quantity")) * 100).cast("bigint").alias("sq_cent")
    )
    s = T(spark, sf, "supplier").filter(F.col("s_nationkey") == 7)
    return (
        ps.join(shipped, (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey))
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .filter(F.col("ps_availqty") * 200 > F.col("sq_cent"))
        .select("s_suppkey", "s_name")
        .distinct()
    )
