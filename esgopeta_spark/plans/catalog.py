"""The graded query catalog: every SURVEY.md §2 operator family as a
(spark_fn, duckdb_oracle_sql) pair over the driver's testdata tables.

Cross-engine determinism rules (every query in this file follows them —
violating any of these makes the driver's value-hash comparison flaky):

1. **Never SUM doubles.**  Spark sums float columns in partition order,
   which is nondeterministic.  Cast to DECIMAL first (exact, order-free),
   cast the final result to DOUBLE.  Source values are 2-decimal money,
   so DECIMAL(12,2)/(4,2) casts are lossless.
2. **Per-row double arithmetic is fine** (IEEE ops are exactly rounded;
   identical operand order ⇒ bitwise-identical results in Spark and
   DuckDB).  Keep the same association/parenthesization on both sides.
3. **Round doubles via integer micro-units** — ``floor(x*1e6 + 0.5)`` as
   BIGINT — never ROUND(double, n), whose half-way mode differs subtly
   across engines.  ROUND on DECIMAL is fine.
4. **LIMIT requires a unique total ORDER BY** (tie column = primary key).
5. Alias every computed column identically on both sides; the driver
   sorts columns by name and hashes values.

Scale posture: every Spark implementation is a declarative DataFrame
plan — filters/projection reach the parquet scan, dimension joins
broadcast, aggregations are partial-before-shuffle, no collect() in any
query path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd  # module-level so pandas_udf type hints resolve under PEP 563

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esgopeta_spark.session import read_table


@dataclass
class QuerySpec:
    name: str
    group: str  # SURVEY.md §2 row(s) this exercises
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver records rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, group: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, group=group, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# helpers -------------------------------------------------------------------

def money(c) -> F.Column:
    """Exact decimal view of a 2-decimal money double (rule 1)."""
    return F.col(c).cast("decimal(12,2)") if isinstance(c, str) else c.cast("decimal(12,2)")


def pct(c) -> F.Column:
    return F.col(c).cast("decimal(4,2)")


def micro(col) -> F.Column:
    """Deterministic 6-dp rounding as integer micro-units (rule 3)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")


T = lambda spark, sf, n: read_table(spark, sf, n)  # noqa: E731


# ===========================================================================
# Group E1/E2 — scan, filter, projection, predicates
# ===========================================================================


@register(
    "scan_filter_project",
    "E1,E2",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS disc_price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_returnflag IN ('A','R') AND l_quantity BETWEEN 5 AND 45
    """,
    doc="predicate+projection pushdown: filters and 5-column ReadSchema reach the parquet scan",
)
def scan_filter_project(spark, sf):
    li = T(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1999-01-01")
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(5, 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (money("l_extendedprice") * (F.lit(1) - pct("l_discount"))).cast("double").alias("disc_price"),
            "l_returnflag",
        )
    )


# ===========================================================================
# Group E3/E4 — joins + aggregations (TPC-H-shaped headliners)
# ===========================================================================


@register(
    "q1_pricing_summary",
    "E2,E4",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: wide aggregate with decimal-exact sums and manual avgs (rule 1)",
)
def q1_pricing_summary(spark, sf):
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    disc_price = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    charge = disc_price * (F.lit(1) + pct("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(money("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(money("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(pct("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    "E3,E4,E6",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> broadcast join -> agg -> unique-ordered top-k",
)
def q3_shipping_priority(spark, sf):
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    rev = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    "E3,E4",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join; all dims broadcast, fact never shuffles pre-agg",
)
def q5_local_supplier_volume(spark, sf):
    c, o, li = T(spark, sf, "customer"), T(spark, sf, "orders"), T(spark, sf, "lineitem")
    s, n, r = T(spark, sf, "supplier"), T(spark, sf, "nation"), T(spark, sf, "region")
    o = o.filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01"))
    r = r.filter(F.col("r_name") == "ASIA")
    rev = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    "E2,E4",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate; the whole WHERE is PushedFilters",
)
def q6_forecast_revenue(spark, sf):
    li = T(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * pct("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    "E3,E4,E6",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20",
)
def q10_returned_items(spark, sf):
    c, o, li, n = (T(spark, sf, t) for t in ["customer", "orders", "lineitem", "nation"])
    o = o.filter((F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01"))
    li = li.filter(F.col("l_returnflag") == "R")
    rev = money("l_extendedprice") * (F.lit(1) - pct("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "join_left_nation_suppliers",
    "E3",
    """
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers,
           CAST(COALESCE(SUM(CAST(s_acctbal AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_acctbal
    FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
    doc="left outer join keeps supplier-less nations with count 0",
)
def join_left_nation_suppliers(spark, sf):
    n, s = T(spark, sf, "nation"), T(spark, sf, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.coalesce(F.sum(money("s_acctbal")), F.lit(0).cast("decimal(12,2)")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "join_full_customer_supplier",
    "E3",
    """
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_customers, s.n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="full outer join; NULL counts where one side has no rows for the nation",
)
def join_full_customer_supplier(spark, sf):
    c = T(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_customers"))
    s = T(spark, sf, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_suppliers"))
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "join_semi_customers_with_orders",
    "E3",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    doc="left-semi join (EXISTS); no fact columns leak past the join",
)
def join_semi_customers_with_orders(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    big = o.filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@register(
    "join_anti_customers_without_orders",
    "E3",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-anti join (NOT EXISTS)",
)
def join_anti_customers_without_orders(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_theta_quantity_band",
    "E3",
    """
    SELECT p_brand, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY p_brand
    """,
    doc="mixed equi+theta join: equi key carries the join, theta residual filters",
)
def join_theta_quantity_band(spark, sf):
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    return (
        li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"))
    )


@register(
    "join_cross_region_status",
    "E3",
    """
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    doc="cross join of two tiny relations (the only place a cross join is legitimate)",
)
def join_cross_region_status(spark, sf):
    r = T(spark, sf, "region").select("r_name")
    s = T(spark, sf, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "agg_count_distinct",
    "E4",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    doc="exact count-distinct (expand+two-phase agg in Spark)",
)
def agg_count_distinct(spark, sf):
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"), F.count("*").alias("n_orders"))
    )


@register(
    "agg_approx_count_distinct",
    "E4",
    None,  # approximate by design: driver records rows-only; pytest checks tolerance vs exact
    doc="approx_count_distinct (HLL++): the 100TB-scale variant of agg_count_distinct",
)
def agg_approx_count_distinct(spark, sf):
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("n_customers_approx"))
    )


@register(
    "agg_rollup_region_nation",
    "E4",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="rollup: per-nation, per-region subtotals and grand total",
)
def agg_rollup_region_nation(spark, sf):
    c, n, r = T(spark, sf, "customer"), T(spark, sf, "nation"), T(spark, sf, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(
        F.sum(money("c_acctbal")).cast("double").alias("total_bal"), F.count("*").alias("n_customers")
    )


@register(
    "agg_cube_flags",
    "E4",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="cube over the two lineitem flags",
)
def agg_cube_flags(spark, sf):
    return (
        T(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum(money("l_quantity")).cast("double").alias("sum_qty"))
    )


@register(
    "agg_grouping_sets",
    "E4",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="explicit grouping sets via SQL surface",
)
def agg_grouping_sets(spark, sf):
    T(spark, sf, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n "
        "FROM _gs_orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"
    )


@register(
    "agg_order_stats",
    "E4",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="min/max/avg/count battery",
)
def agg_order_stats(spark, sf):
    return (
        T(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.min(money("o_totalprice")).cast("double").alias("min_price"),
            F.max(money("o_totalprice")).cast("double").alias("max_price"),
            (F.sum(money("o_totalprice")).cast("double") / F.count("*")).alias("avg_price"),
        )
    )


# ===========================================================================
# Group E5 — window functions
# ===========================================================================


@register(
    "win_topk_orders_per_customer",
    "E5,E6",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    doc="top-k per group: one window, no self-join",
)
def win_topk_orders_per_customer(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        T(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_rank_parts_by_size",
    "E5",
    """
    SELECT p_brand, p_partkey, p_size,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_dense_rank,
           NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS size_quartile
    FROM part
    """,
    doc="rank/dense_rank tolerate peer ties; ntile gets a unique order",
)
def win_rank_parts_by_size(spark, sf):
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    wu = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc(), F.col("p_partkey"))
    return T(spark, sf, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).cast("bigint").alias("size_rank"),
        F.dense_rank().over(w).cast("bigint").alias("size_dense_rank"),
        F.ntile(4).over(wu).cast("bigint").alias("size_quartile"),
    )


@register(
    "win_lag_order_gaps",
    "E5,E8",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
           CAST(lead(o_totalprice) OVER w AS DOUBLE) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead with a deterministic tie-broken order",
)
def win_lag_order_gaps(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = T(spark, sf, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lag(F.col("o_orderdate").cast("date")).over(w)).alias(
            "days_since_prev"
        ),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "win_running_total",
    "E5",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="running aggregate with an explicit ROWS frame (decimal-exact, rule 1)",
)
def win_running_total(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", F.sum(money("o_totalprice")).over(w).cast("double").alias("running_spend")
    )


@register(
    "win_range_30d_orders",
    "E5",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate) // 86400000
                          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d
    FROM orders
    """,
    doc="RANGE frame over an epoch-day key: trailing 30-day order count",
)
def win_range_30d_orders(spark, sf):
    o = T(spark, sf, "orders").withColumn(
        "_day", F.expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
    )
    w = Window.partitionBy("o_custkey").orderBy("_day").rangeBetween(-30, 0)
    return o.select("o_custkey", "o_orderkey", F.count("*").over(w).alias("n_orders_30d"))


# ===========================================================================
# Group E6/E7 — sort/limit, set operations
# ===========================================================================


@register(
    "sort_top25_orders",
    "E6",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    doc="global top-k: Spark TakeOrderedAndProject, never a full sort",
)
def sort_top25_orders(spark, sf):
    return (
        T(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "set_union_big_spenders",
    "E7",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 8000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
    doc="UNION (distinct) of two key sets",
)
def set_union_big_spenders(spark, sf):
    a = T(spark, sf, "customer").filter(F.col("c_acctbal") > 8000).select("c_custkey")
    b = T(spark, sf, "orders").filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct()


@register(
    "set_intersect_segments",
    "E7",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="INTERSECT of customers with both finished and open orders",
)
def set_intersect_segments(spark, sf):
    o = T(spark, sf, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )


@register(
    "set_except_no_recent",
    "E7",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    """,
    doc="EXCEPT: customers with no orders since 2000",
)
def set_except_no_recent(spark, sf):
    c = T(spark, sf, "customer").select("c_custkey")
    recent = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(recent)  # subtract = distinct EXCEPT, matching SQL set semantics


# ===========================================================================
# Group E8 — scalar function batteries
# ===========================================================================


@register(
    "str_funcs_customer",
    "E8",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_mktsegment, ':', CAST(c_custkey AS VARCHAR)) AS seg_key,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           trim(lower(c_mktsegment)) AS seg_lower,
           replace(c_name, 'Customer', 'Cust') AS name_short
    FROM customer
    """,
    doc="string battery: upper/substr/length/concat/regexp_extract/trim/replace",
)
def str_funcs_customer(spark, sf):
    c = T(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat_ws(":", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.trim(F.lower("c_mktsegment")).alias("seg_lower"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
    )


@register(
    "date_funcs_orders",
    "E8",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_cutoff,
           epoch_ms(o_orderdate) AS order_epoch_ms
    FROM orders
    """,
    doc="date battery: year/month/day, trunc, interval add, datediff, epoch",
)
def date_funcs_orders(spark, sf):
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_cutoff"),
        F.unix_millis("o_orderdate").alias("order_epoch_ms"),
    )


@register(
    "math_funcs_lineitem",
    "E8",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS qty_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign
    FROM lineitem
    """,
    doc="math battery restricted to exactly-rounded IEEE ops (rule 2): abs/floor/ceil/mod/sqrt/sign",
)
def math_funcs_lineitem(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@register(
    "array_funcs_part_names",
    "E8",
    """
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS n_words,
           string_split(p_name, ' ')[1] AS first_word,
           list_contains(string_split(p_name, ' '), 'green') AS has_green,
           array_to_string(list_sort(string_split(p_name, ' ')), '_') AS sorted_words
    FROM part
    """,
    doc="array battery: split/size/element_at/contains/sort/join",
)
def array_funcs_part_names(spark, sf):
    p = T(spark, sf, "part")
    wordsc = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(wordsc).cast("bigint").alias("n_words"),
        F.element_at(wordsc, 1).alias("first_word"),
        F.array_contains(wordsc, "green").alias("has_green"),
        F.array_join(F.sort_array(wordsc), "_").alias("sorted_words"),
    )


@register(
    "json_funcs_events",
    "E8",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS prop_missing
    FROM events
    """,
    doc="JSON extraction from the events.props string column",
)
def json_funcs_events(spark, sf):
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
    )


# ===========================================================================
# Group E9 — UDF surface (Arrow-vectorized; never row-at-a-time Python)
# ===========================================================================


@register(
    "udf_pandas_charge",
    "E9",
    """
    SELECT l_orderkey, l_linenumber,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge
    FROM lineitem WHERE l_quantity > 40
    """,
    doc="scalar pandas_udf (Arrow batches); identical IEEE op order to the oracle (rule 2)",
)
def udf_pandas_charge(spark, sf):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1 - disc)) * (1 + tax)

    li = T(spark, sf, "lineitem").filter(F.col("l_quantity") > 40)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "udf_grouped_agg_qty",
    "E9",
    """
    SELECT l_returnflag,
           SUM(CAST(l_quantity * 100 AS BIGINT)) AS qty_centi,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="grouped-AGGREGATE pandas_udf (the third UDF shape next to scalar and "
    "grouped-map): per-group reduction runs in pandas over Arrow batches; "
    "integer centi-units make the sum order-independent (rule 3), so the "
    "Python-side fold hash-matches the SQL aggregate exactly",
)
def udf_grouped_agg_qty(spark, sf):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def qty_centi(q: pd.Series) -> int:
        # quantities are 2-decimal; scale to exact int64 before summing so
        # the reduction is associative (no float accumulation order issues)
        return int((q * 100).round().astype("int64").sum())

    @pandas_udf("bigint")
    def n_rows(q: pd.Series) -> int:
        # grouped-agg pandas UDFs cannot mix with JVM aggregates in one
        # agg — the count is a second pandas reduction over the same group
        return int(len(q))

    li = T(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qty_centi("l_quantity").alias("qty_centi"),
        n_rows("l_quantity").alias("n_lines"),
    )


@register(
    "udf_grouped_demean",
    "E9",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity - MIN(l_quantity) OVER (PARTITION BY l_returnflag) AS qty_above_min,
           CAST(l_quantity = MAX(l_quantity) OVER (PARTITION BY l_returnflag) AS BOOLEAN) AS is_group_max
    FROM lineitem
    """,
    doc="applyInPandas grouped-map (per-group min/max offset — exact doubles, rule 2); "
    "oracle re-derives it with window functions",
)
def udf_grouped_demean(spark, sf):
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"]
        out = pdf[["l_orderkey", "l_linenumber"]].copy()
        out["qty_above_min"] = q - q.min()
        out["is_group_max"] = q == q.max()
        return out

    return li.groupBy("l_returnflag").applyInPandas(
        demean, "l_orderkey bigint, l_linenumber int, qty_above_min double, is_group_max boolean"
    )


# ===========================================================================
# Graph surface (reference groups A/B/D) — graded with SQL oracles by
# deriving a deterministic update-log from the events table
# ===========================================================================


def _events_as_updates(spark, sf) -> DataFrame:
    """events -> gun_updates-shaped quads: soul=user node, field=event_type,
    value=number, state=event time (ms).  Deterministic derivation so the
    DuckDB oracle can re-create the identical log."""
    e = T(spark, sf, "events")
    return e.select(
        F.concat(F.lit("user/"), F.col("user_id").cast("string")).alias("soul"),
        F.col("event_type").alias("field"),
        F.lit("number").alias("value_type"),
        F.col("value").cast("string").alias("value_number_raw"),
        F.col("value").alias("value_number"),
        F.lit(None).cast("string").alias("value_string"),
        F.lit(None).cast("boolean").alias("value_bool"),
        F.lit(None).cast("string").alias("value_relation"),
        F.unix_millis("ts").cast("double").alias("state"),
    )


@register(
    "graph_ham_merge_events",
    "A10,D4",
    """
    WITH upd AS (
      SELECT 'user/' || CAST(user_id AS VARCHAR) AS soul,
             event_type AS field,
             value AS value_number,
             CAST(value AS VARCHAR) AS value_json,
             CAST(epoch_ms(ts) AS DOUBLE) AS state
      FROM events),
    r AS (
      SELECT soul, field, value_number, state,
             ROW_NUMBER() OVER (PARTITION BY soul, field
                                ORDER BY state DESC, value_json DESC) AS rn
      FROM upd)
    SELECT soul, field, value_number, state FROM r WHERE rn = 1
    """,
    doc="HAM last-write-wins merge (gun/state.go:60-79) over an events-derived update log; "
    "oracle = the same total order (state, value_json) as a SQL window",
)
def graph_ham_merge_events(spark, sf):
    from esgopeta_spark.ham import ham_merge

    merged = ham_merge(_events_as_updates(spark, sf))
    return merged.select("soul", "field", "value_number", "state")


@register(
    "graph_traverse_customer_region",
    "A1,A2",
    """
    SELECT c_custkey, r_name AS region_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    """,
    doc="bulk path traversal customer->nation->region via GunGraph.traverse "
    "(iterated equi-joins on the relation slice; gun/scoped.go path chains)",
)
def graph_traverse_customer_region(spark, sf):
    from esgopeta_spark.graph import GunGraph
    from esgopeta_spark.types import QUAD_SCHEMA

    c, n, r = T(spark, sf, "customer"), T(spark, sf, "nation"), T(spark, sf, "region")
    mk = lambda df, cols: df.select(*cols)  # noqa: E731
    rel = lambda soul, field, dst: [  # noqa: E731
        soul.alias("soul"),
        F.lit(field).alias("field"),
        F.lit("relation").alias("value_type"),
        F.lit(None).cast("string").alias("value_number_raw"),
        F.lit(None).cast("double").alias("value_number"),
        F.lit(None).cast("string").alias("value_string"),
        F.lit(None).cast("boolean").alias("value_bool"),
        dst.alias("value_relation"),
        F.lit(1.0).alias("state"),
    ]
    sval = lambda soul, field, v: [  # noqa: E731
        soul.alias("soul"),
        F.lit(field).alias("field"),
        F.lit("string").alias("value_type"),
        F.lit(None).cast("string").alias("value_number_raw"),
        F.lit(None).cast("double").alias("value_number"),
        v.alias("value_string"),
        F.lit(None).cast("boolean").alias("value_bool"),
        F.lit(None).cast("string").alias("value_relation"),
        F.lit(1.0).alias("state"),
    ]
    cust_soul = F.concat(F.lit("customer/"), F.col("c_custkey").cast("string"))
    nat_soul = F.concat(F.lit("nation/"), F.col("c_nationkey").cast("string"))
    nat_soul2 = F.concat(F.lit("nation/"), F.col("n_nationkey").cast("string"))
    reg_soul = F.concat(F.lit("region/"), F.col("n_regionkey").cast("string"))
    reg_soul2 = F.concat(F.lit("region/"), F.col("r_regionkey").cast("string"))
    quads = (
        mk(c, rel(cust_soul, "nation", nat_soul))
        .unionByName(mk(n, rel(nat_soul2, "region", reg_soul)))
        .unionByName(mk(r, sval(reg_soul2, "name", F.col("r_name"))))
    )
    g = GunGraph(spark, quads)
    roots = c.select(cust_soul.alias("soul"), F.col("c_custkey"))
    hopped = g.traverse(roots, "nation", "region")
    return g.values_at(hopped, "name").select("c_custkey", F.col("value_string").alias("region_name"))


@register(
    "graph_edge_degree",
    "A1,E4",
    """
    WITH edges AS (
      SELECT 'customer/' || CAST(c_custkey AS VARCHAR) AS src,
             'nation/' || CAST(c_nationkey AS VARCHAR) AS dst, 'nation' AS attr
      FROM customer
      UNION ALL
      SELECT 'supplier/' || CAST(s_suppkey AS VARCHAR),
             'nation/' || CAST(s_nationkey AS VARCHAR), 'nation'
      FROM supplier)
    SELECT dst, COUNT(*) AS in_degree FROM edges GROUP BY dst
    """,
    doc="edge-list analytics (GraphX-style degree count) over the relation slice",
)
def graph_edge_degree(spark, sf):
    from esgopeta_spark.graph import GunGraph

    c, s = T(spark, sf, "customer"), T(spark, sf, "supplier")
    rel_rows = lambda df, src, dst: df.select(  # noqa: E731
        src.alias("soul"),
        F.lit("nation").alias("field"),
        F.lit("relation").alias("value_type"),
        F.lit(None).cast("string").alias("value_number_raw"),
        F.lit(None).cast("double").alias("value_number"),
        F.lit(None).cast("string").alias("value_string"),
        F.lit(None).cast("boolean").alias("value_bool"),
        dst.alias("value_relation"),
        F.lit(1.0).alias("state"),
    )
    quads = rel_rows(
        c,
        F.concat(F.lit("customer/"), F.col("c_custkey").cast("string")),
        F.concat(F.lit("nation/"), F.col("c_nationkey").cast("string")),
    ).unionByName(
        rel_rows(
            s,
            F.concat(F.lit("supplier/"), F.col("s_suppkey").cast("string")),
            F.concat(F.lit("nation/"), F.col("s_nationkey").cast("string")),
        )
    )
    g = GunGraph(spark, quads)
    return g.edges().groupBy("dst").agg(F.count("*").alias("in_degree"))


# ===========================================================================
# Group F — streaming semantics, graded in their batch-equivalent form
# (test_streaming.py proves batch≡stream on the same frames)
# ===========================================================================


@register(
    "stream_tumbling_counts",
    "F3",
    """
    SELECT epoch_ms(ts) // 3600000 * 3600000 AS w_start_ms, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    doc="1-hour tumbling window aggregate (window() in Spark; epoch-aligned both engines)",
)
def stream_tumbling_counts(spark, sf):
    e = T(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.unix_millis("w.start").alias("w_start_ms"), "event_type", "n_events", "total_value")
    )


@register(
    "stream_sliding_counts",
    "F3",
    """
    WITH b AS (
      SELECT event_type, epoch_ms(ts) // 1800000 * 1800000 AS b0 FROM events),
    w AS (
      SELECT event_type, unnest([b0, b0 - 1800000]) AS w_start_ms FROM b)
    SELECT w_start_ms, event_type, COUNT(*) AS n_events
    FROM w GROUP BY w_start_ms, event_type
    """,
    doc="1-hour window sliding every 30 min: each event lands in exactly 2 windows",
)
def stream_sliding_counts(spark, sf):
    e = T(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_millis("w.start").alias("w_start_ms"), "event_type", "n_events")
    )


@register(
    "stream_session_windows",
    "F4",
    """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events),
    m AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL OR ts >= prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      FROM o),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
    SELECT user_id, epoch_ms(MIN(ts)) AS session_start_ms, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="session windows, 30-min gap (session_window in Spark; gaps-and-islands oracle)",
)
def stream_session_windows(spark, sf):
    e = T(spark, sf, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.unix_millis("w.start").alias("session_start_ms"), "n_events")
    )


@register(
    "stream_dedup_events",
    "F6",
    """
    SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    """,
    doc="streaming dedup in batch form: doubled input -> dropDuplicates(event_id) "
    "restores exactly the original rows",
)
def stream_dedup_events(spark, sf):
    e = T(spark, sf, "events")
    doubled = e.unionByName(e)
    return doubled.dropDuplicates(["event_id"]).groupBy("event_type").agg(F.count("*").alias("n"))


# ===========================================================================
# Group G — LLM-data-pipeline operators
# ===========================================================================


@register(
    "dedup_exact_docs",
    "G1",
    """
    SELECT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm_text,
           COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
    FROM documents GROUP BY 1
    """,
    doc="exact dedup groups on normalized text (hash-groupBy; min_by keeper)",
)
def dedup_exact_docs(spark, sf):
    from esgopeta_spark.operators.dedup import normalize_text

    d = T(spark, sf, "documents")
    return (
        d.groupBy(normalize_text(F.col("text")).alias("norm_text"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_id"))
    )


@register(
    "dedup_minhash_pairs",
    "G2",
    None,  # LSH banding is not SQL-expressible; pytest verifies vs brute-force Jaccard
    doc="MinHash-LSH near-dup candidate pairs verified by exact n-gram Jaccard >= 0.6",
)
def dedup_minhash_pairs(spark, sf):
    from esgopeta_spark.operators.dedup import minhash_dedup_pairs

    d = T(spark, sf, "documents")
    return minhash_dedup_pairs(d, threshold=0.6).orderBy("id_a", "id_b")


@register(
    "dedup_simhash_pairs",
    "G2",
    None,  # pytest checks structure + hamming bound
    doc="SimHash near-dup pairs (64-bit fingerprint, banded, hamming <= 6)",
)
def dedup_simhash_pairs(spark, sf):
    from esgopeta_spark.operators.dedup import simhash_candidates

    d = T(spark, sf, "documents")
    return simhash_candidates(d, max_hamming=6).orderBy("id_a", "id_b")


def _portable_minhash_oracle():
    from esgopeta_spark.operators.dedup import portable_minhash_pairs_sql

    return portable_minhash_pairs_sql()


def _portable_simhash_oracle():
    from esgopeta_spark.operators.dedup import portable_simhash_pairs_sql

    return portable_simhash_pairs_sql()


@register(
    "dedup_minhash_pairs_portable",
    "G2",
    _portable_minhash_oracle(),
    doc="portable-hash MinHash-LSH candidate pairs (r10): md5-derived "
    "32-bit gram hashes + (A*g+B) mod (2^61-1) lane mins + md5 band "
    "keys, so DuckDB recomputes the IDENTICAL signatures and the LSH "
    "machinery itself is hash-exact cross-engine (the xxhash64 twin "
    "dedup_minhash_pairs stays the cheaper production path; recall "
    "parity between the two hash families pinned in pytest).  Plan: "
    "same banded equi self-join as the production path, checkpointed "
    "signature relation, never all-pairs; operators/dedup.py "
    "minhash_lsh_candidates_portable",
)
def dedup_minhash_pairs_portable(spark, sf):
    from esgopeta_spark.operators.dedup import minhash_lsh_candidates_portable

    return minhash_lsh_candidates_portable(T(spark, sf, "documents"))


@register(
    "dedup_simhash_pairs_portable",
    "G2",
    _portable_simhash_oracle(),
    doc="portable-hash SimHash near-dup pairs (r10): 32-bit fingerprint "
    "from md5 word-hash bit votes weighted by term count, banded "
    "Hamming equi-join on 4x8-bit chunks (full pigeonhole recall at "
    "hamming <= 3), exact bit_count verify — the whole "
    "fingerprint+banding pipeline recomputed by DuckDB, hash-exact.  "
    "Plan: one (doc, word) groupBy + one 32-sum per-doc aggregate "
    "(codegen) + the chunk-bucketed self-join; operators/dedup.py "
    "simhash_candidates_portable",
)
def dedup_simhash_pairs_portable(spark, sf):
    from esgopeta_spark.operators.dedup import simhash_candidates_portable

    return simhash_candidates_portable(T(spark, sf, "documents"))


@register(
    "dedup_fuzzy_titles",
    "G2,E3",
    r"""
    WITH tdocs AS (
      SELECT doc_id,
             'sec ' || ((doc_id // 7) % 1000) || ' item ' || ((doc_id // 7) % 997)
               || ' rev ' || ((doc_id // 7) % 991) ||
             CASE doc_id % 7 WHEN 0 THEN '' WHEN 1 THEN ' x' WHEN 2 THEN ' xx'
                  WHEN 3 THEN ' y' WHEN 4 THEN ' yy' WHEN 5 THEN ' z'
                  ELSE ' zz' END AS title
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist
    FROM tdocs a JOIN tdocs b
      ON a.doc_id < b.doc_id
     AND abs(length(a.title) - length(b.title)) <= 2
     AND levenshtein(a.title, b.title) <= 2
    """,
    doc="edit-distance fuzzy join (r10 — PassJoin partition pigeonhole, "
    "Li et al. 2011): all title pairs within Levenshtein distance 2 via "
    "an EQUI join on (segment ordinal, indexed length, segment string) "
    "keys — one side indexes its own 3 even segments, the other probes "
    "every +-2-shifted same-shaped substring for every candidate length "
    "— then exact-verified with F.levenshtein.  The ORACLE is the "
    "brute-force cross join with DuckDB's independent levenshtein, so "
    "the hash compare proves BOTH full recall of the banding AND "
    "agreement of two edit-distance implementations.  Fixture: groups "
    "of 7 docs share three group-derived numbers spread across all "
    "three segments (every segment stays a SELECTIVE signature — the "
    "r10-measured corpus-constant-prefix pathology is documented in "
    "the operator docstring and SCALE.md) with 7 near-suffix variants.  "
    "Plan: checkpointed base, 75 probe keys/row, one equi shuffle + "
    "distinct + verify projection — never all-pairs on selective "
    "segments; operators/dedup.py edit_distance_pairs",
)
def dedup_fuzzy_titles(spark, sf):
    from esgopeta_spark.operators.dedup import edit_distance_pairs

    did = F.col("doc_id")
    g = F.expr("doc_id div 7")
    titles = T(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("sec "), (g % 1000).cast("string"),
            F.lit(" item "), (g % 997).cast("string"),
            F.lit(" rev "), (g % 991).cast("string"),
            F.when(did % 7 == 1, F.lit(" x"))
            .when(did % 7 == 2, F.lit(" xx"))
            .when(did % 7 == 3, F.lit(" y"))
            .when(did % 7 == 4, F.lit(" yy"))
            .when(did % 7 == 5, F.lit(" z"))
            .when(did % 7 == 6, F.lit(" zz"))
            .otherwise(F.lit("")),
        ).alias("title"),
    )
    return edit_distance_pairs(titles)


@register(
    "dedup_fuzzy_family_titles",
    "G2,E3",
    r"""
    WITH tdocs AS (
      SELECT doc_id,
             CASE WHEN doc_id = 0 THEN 'misc'
                  WHEN doc_id % 2 = 0 THEN 'report' ELSE 'memo' END AS fam,
             CASE WHEN doc_id = 0 THEN 'odd one out '
                  WHEN doc_id % 2 = 0
                  THEN 'quarterly financial report for fiscal period '
                  ELSE 'internal memo draft revision ' END
             || 'sec ' || ((doc_id // 7) % 1000)
             || ' item ' || ((doc_id // 7) % 997)
             || ' rev ' || ((doc_id // 7) % 991) ||
             CASE doc_id % 7 WHEN 0 THEN '' WHEN 1 THEN ' x' WHEN 2 THEN ' xx'
                  WHEN 3 THEN ' y' WHEN 4 THEN ' yy' WHEN 5 THEN ' z'
                  ELSE ' zz' END AS title
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.title, b.title) AS INTEGER) AS dist
    FROM tdocs a JOIN tdocs b
      ON a.doc_id < b.doc_id
     AND a.fam = b.fam
     AND abs(length(a.title) - length(b.title)) <= 2
     AND levenshtein(a.title, b.title) <= 2
    """,
    doc="PER-FAMILY edit-distance fuzzy join (r12, verdict #4): two "
    "boilerplate families with DISTINCT constant prefixes plus one "
    "outlier doc whose title zeroes the corpus-GLOBAL LCP statistic — "
    "the case the r11 auto-fold cannot help.  family_col scopes the "
    "PassJoin within each family (the family is an extra equi key) "
    "and folds each family's OWN prefix into its segment-0 boundary, "
    "computed from one (min, max, min-length) group aggregate "
    "(bounded driver map, the codebook discipline).  The ORACLE is "
    "the brute-force same-family levenshtein cross join in DuckDB, so "
    "the hash compare proves full within-family banding recall.  "
    "Plan: one checkpointed key projection, one equi shuffle "
    "including the family key, never all-pairs; "
    "operators/dedup.py edit_distance_pairs(family_col=...)",
)
def dedup_fuzzy_family_titles(spark, sf):
    from esgopeta_spark.operators.dedup import edit_distance_pairs

    did = F.col("doc_id")
    g = F.expr("doc_id div 7")
    titles = T(spark, sf, "documents").select(
        "doc_id",
        F.when(did == 0, F.lit("misc"))
        .when(did % 2 == 0, F.lit("report"))
        .otherwise(F.lit("memo")).alias("fam"),
        F.concat(
            F.when(did == 0, F.lit("odd one out "))
            .when(did % 2 == 0,
                  F.lit("quarterly financial report for fiscal period "))
            .otherwise(F.lit("internal memo draft revision ")),
            F.lit("sec "), (g % 1000).cast("string"),
            F.lit(" item "), (g % 997).cast("string"),
            F.lit(" rev "), (g % 991).cast("string"),
            F.when(did % 7 == 1, F.lit(" x"))
            .when(did % 7 == 2, F.lit(" xx"))
            .when(did % 7 == 3, F.lit(" y"))
            .when(did % 7 == 4, F.lit(" yy"))
            .when(did % 7 == 5, F.lit(" z"))
            .when(did % 7 == 6, F.lit(" zz"))
            .otherwise(F.lit("")),
        ).alias("title"),
    )
    return edit_distance_pairs(titles, family_col="fam")


@register(
    "text_profile_docs",
    "G4",
    None,  # oracle SQL set in _TEXT_PROFILE_ORACLE below (long); see module bottom
    doc="token counts, ratios, language guess, md5 fingerprint per document",
)
def text_profile_docs(spark, sf):
    from esgopeta_spark.operators.text import text_profile

    return text_profile(T(spark, sf, "documents"))


@register(
    "text_langid_agg",
    "G4",
    None,  # oracle set below with text_profile machinery
    doc="declared lang vs stopword-heuristic guess, confusion counts",
)
def text_langid_agg(spark, sf):
    from esgopeta_spark.operators.text import lang_guess

    d = T(spark, sf, "documents")
    return d.groupBy(F.col("lang"), lang_guess(F.col("text")).alias("lang_guess")).agg(
        F.count("*").alias("n_docs")
    )


@register(
    "sim_topk_cosine",
    "G3",
    """
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.query_id, c.vec_id AS nbr_id,
             list_dot_product(q.qv, c.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))) AS cosine_sim
      FROM q JOIN c ON c.vec_id <> q.query_id),
    r AS (SELECT query_id, nbr_id, cosine_sim,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine_sim DESC, nbr_id) AS rank
          FROM scored)
    SELECT query_id, nbr_id, CAST(floor(cosine_sim * 1000000 + 0.5) AS BIGINT) AS cosine_micro, rank
    FROM r WHERE rank <= 5
    """,
    doc="exact brute-force top-5 cosine neighbors for every 50th vector; "
    "broadcast queries, corpus never shuffles",
)
def sim_topk_cosine(spark, sf):
    from esgopeta_spark.operators.similarity import topk_cosine

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    out = topk_cosine(emb, queries, k=5, dim=64)
    return out.select(
        "query_id",
        "nbr_id",
        F.floor(F.col("cosine_sim") * 1000000.0 + 0.5).cast("bigint").alias("cosine_micro"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def _lsh_oracle() -> str:
    """Full-pipeline DuckDB oracle for the hyperplane-LSH entry (r6).

    Possible because every stage is bit-reproducible: the hyperplanes
    are deterministic constants (inlined below via repr() — shortest
    decimal repr parses back to the identical double), the bucket dots
    accumulate in sequential element order on BOTH engines (the Arrow
    kernel's fused loop == list_dot_product's fold), and the rerank
    cosine is the same prenormed sequential arithmetic as every other
    graded similarity entry.  The approximation is in the ALGORITHM
    (bucketing), not the execution — so the exact candidate set, ranks,
    and micro-cosines all hash-match."""
    from esgopeta_spark.operators.similarity import _hyperplanes

    n_tables, n_planes, seed = 4, 6, 42
    buckets = []
    for t in range(n_tables):
        planes = _hyperplanes(64, n_planes, seed + 1000 * t)
        bits = []
        for i, p in enumerate(planes):
            arr = "[" + ",".join(repr(x) for x in p) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product(v, {arr}) >= 0 THEN {2 ** i} ELSE 0 END)"
            )
        buckets.append("(" + " + ".join(bits) + ")")
    ba = "[" + ", ".join(buckets) + "]"
    return f"""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cb AS MATERIALIZED (SELECT vec_id, v, {ba} AS ba FROM c),
    q AS (SELECT vec_id AS query_id, v AS qv, ba AS qba FROM cb WHERE vec_id % 50 = 0),
    ce AS (SELECT vec_id AS nbr_id, v, ba, t.t AS t, ba[t.t + 1] AS b
           FROM cb CROSS JOIN generate_series(0, {n_tables - 1}) t(t)),
    qe AS (SELECT query_id, qv, qba, t.t AS t, qba[t.t + 1] AS b
           FROM q CROSS JOIN generate_series(0, {n_tables - 1}) t(t)),
    cand AS (
      SELECT qe.query_id, ce.nbr_id, qe.qv, ce.v
      FROM ce JOIN qe ON ce.t = qe.t AND ce.b = qe.b
      WHERE ce.nbr_id <> qe.query_id
        AND list_position(list_transform(range(1, {n_tables + 1}),
                                         i -> ce.ba[i] = qe.qba[i]), true) = qe.t + 1),
    scored AS (
      SELECT query_id, nbr_id,
             list_dot_product(qv, v)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cs
      FROM cand),
    r AS (SELECT query_id, nbr_id, cs,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cs DESC, nbr_id ASC) AS rank
          FROM scored)
    SELECT query_id, nbr_id,
           CAST(floor(cs * 1000000 + 0.5) AS BIGINT) AS cosine_micro,
           CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= 5
    """


@register(
    "sim_topk_cosine_lsh",
    "G3",
    _lsh_oracle(),
    doc="hyperplane-LSH approximate top-5 cosine (the 100TB path: bucket "
    "equi-join, no cross join).  r6: FULL-PIPELINE oracle — the plane "
    "constants inline into the SQL and every dot accumulates in the same "
    "sequential IEEE order on both engines, so the bucketed candidate "
    "set, first-match dedup, ranks and micro-cosines hash-match exactly "
    "(the approximation is the algorithm, not the execution); recall vs "
    "the exact tier stays pinned in pytest",
)
def sim_topk_cosine_lsh(spark, sf):
    from esgopeta_spark.operators.similarity import topk_cosine_lsh

    emb = T(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("query_id"), "embedding")
    out = topk_cosine_lsh(emb, queries, dim=64, k=5, n_planes=6, n_tables=4)
    return out.select(
        "query_id",
        "nbr_id",
        F.floor(F.col("cosine_sim") * 1000000.0 + 0.5).cast("bigint").alias("cosine_micro"),
        "rank",
    )


@register(
    "emb_label_stats",
    "G5",
    """
    SELECT label, COUNT(*) AS n_vectors,
           CAST(SUM(CAST(floor(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                     CAST(embedding AS DOUBLE[]))) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_norm_micro
    FROM embeddings GROUP BY label
    """,
    doc="array<float> columns as first-class data: per-label count and exact summed norms "
    "(per-row fold -> integer micro-units -> integer sum; rule 1&3)",
)
def emb_label_stats(spark, sf):
    from esgopeta_spark.operators.similarity import as_double, l2_norm

    emb = T(spark, sf, "embeddings")
    norm_micro = F.floor(l2_norm(as_double(F.col("embedding"))) * 1000000.0 + 0.5).cast("bigint")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"), F.sum(norm_micro).cast("bigint").alias("sum_norm_micro")
    )


# text_profile needs a long oracle; register it after the function exists
def _text_profile_oracle() -> str:
    from esgopeta_spark.operators.text import STOPWORDS, TOKEN_REGEX

    def sw_list(lang):
        return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    hits = {
        l: f"len(list_intersect(list_distinct(w.words), {sw_list(l)}))" for l in ["en", "de", "fr", "es"]
    }
    best = f"greatest({hits['en']}, {hits['de']}, {hits['fr']}, {hits['es']})"
    return f"""
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents),
    w AS (
      SELECT doc_id, norm,
             CASE WHEN length(norm) = 0 THEN [] ELSE string_split(norm, ' ') END AS words
      FROM n)
    SELECT doc_id,
           CAST(len(w.words) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(norm, '{TOKEN_REGEX}')) AS INTEGER) AS n_regex_tokens,
           CAST(floor(CASE WHEN len(w.words) > 0
                 THEN CAST(list_sum(list_transform(w.words, x -> length(x))) AS DOUBLE) / len(w.words)
                 ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS mean_word_len_micro,
           CAST(floor(CASE WHEN length(norm) > 0
                 THEN CAST(length(regexp_replace(norm, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(norm)
                 ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS punct_ratio_micro,
           CAST(floor(CASE WHEN length(norm) > 0
                 THEN CAST(length(regexp_replace(norm, '[^a-z]', '', 'g')) AS DOUBLE) / length(norm)
                 ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS alpha_ratio_micro,
           CAST(floor(CASE WHEN len(w.words) > 0
                 THEN CAST(len(list_filter(w.words, x -> list_contains({sw_list('en')}, x))) AS DOUBLE) / len(w.words)
                 ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS stopword_ratio_micro,
           CASE WHEN {best} <= 0 THEN 'und'
                WHEN {hits['en']} = {best} THEN 'en'
                WHEN {hits['de']} = {best} THEN 'de'
                WHEN {hits['fr']} = {best} THEN 'fr'
                WHEN {hits['es']} = {best} THEN 'es'
                ELSE 'und' END AS lang_guess,
           md5(norm) AS fingerprint
    FROM w
    """


def _text_profile_spark(spark, sf):
    """micro-unit variant of text_profile (rule 3: integer ratios cross-engine)."""
    from esgopeta_spark.operators.text import (
        alpha_ratio,
        fingerprint,
        lang_guess,
        mean_word_len,
        punct_ratio,
        regex_token_count,
        stopword_ratio,
        token_count,
    )

    d = T(spark, sf, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        regex_token_count(c).alias("n_regex_tokens"),
        micro(mean_word_len(c)).alias("mean_word_len_micro"),
        micro(punct_ratio(c)).alias("punct_ratio_micro"),
        micro(alpha_ratio(c)).alias("alpha_ratio_micro"),
        micro(stopword_ratio(c)).alias("stopword_ratio_micro"),
        lang_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )


REGISTRY["text_profile_docs"].fn = _text_profile_spark
REGISTRY["text_profile_docs"].oracle = _text_profile_oracle()


def _text_langid_oracle() -> str:
    from esgopeta_spark.operators.text import STOPWORDS

    def sw_list(lang):
        return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    hits = {
        l: f"len(list_intersect(list_distinct(words), {sw_list(l)}))" for l in ["en", "de", "fr", "es"]
    }
    best = f"greatest({hits['en']}, {hits['de']}, {hits['fr']}, {hits['es']})"
    return f"""
    WITH w AS (
      SELECT lang,
             CASE WHEN length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) = 0 THEN []
                  ELSE string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') END AS words
      FROM documents)
    SELECT lang,
           CASE WHEN {best} <= 0 THEN 'und'
                WHEN {hits['en']} = {best} THEN 'en'
                WHEN {hits['de']} = {best} THEN 'de'
                WHEN {hits['fr']} = {best} THEN 'fr'
                WHEN {hits['es']} = {best} THEN 'es'
                ELSE 'und' END AS lang_guess,
           COUNT(*) AS n_docs
    FROM w GROUP BY lang, lang_guess
    """


REGISTRY["text_langid_agg"].oracle = _text_langid_oracle()


# ---------------------------------------------------------------------------
# End-to-end training-data pipeline composition (G1+G4 in one plan):
# dedup -> quality gate -> language rollup.  The showcase shape: each stage
# is the operator library's own function, fused by Catalyst into one plan.
# ---------------------------------------------------------------------------


def _pipeline_oracle() -> str:
    from esgopeta_spark.operators.text import STOPWORDS

    def sw_list(lang):
        return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    hits = {
        l: f"len(list_intersect(list_distinct(words), {sw_list(l)}))" for l in ["en", "de", "fr", "es"]
    }
    best = f"greatest({hits['en']}, {hits['de']}, {hits['fr']}, {hits['es']})"
    return f"""
    WITH n AS (
      SELECT doc_id, source, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    keep AS (  -- stage 1: exact dedup, lowest doc_id per normalized text wins
      SELECT MIN(doc_id) AS doc_id FROM n GROUP BY norm),
    d AS (
      SELECT n.doc_id, n.source,
             CASE WHEN length(n.norm) = 0 THEN [] ELSE string_split(n.norm, ' ') END AS words
      FROM n JOIN keep ON n.doc_id = keep.doc_id),
    q AS (  -- stage 2: quality gate on token count + alpha ratio of words
      SELECT doc_id, source, words,
             CASE WHEN {best} <= 0 THEN 'und'
                  WHEN {hits['en']} = {best} THEN 'en'
                  WHEN {hits['de']} = {best} THEN 'de'
                  WHEN {hits['fr']} = {best} THEN 'fr'
                  WHEN {hits['es']} = {best} THEN 'es'
                  ELSE 'und' END AS lang_guess
      FROM d WHERE len(words) >= 10)
    SELECT source, lang_guess,
           COUNT(*) AS n_docs,
           CAST(SUM(len(words)) AS BIGINT) AS total_tokens
    FROM q GROUP BY source, lang_guess
    """


@register(
    "pipeline_dedup_quality_lang",
    "G1,G4,E3,E4",
    None,  # long oracle attached below (same builder pattern as text_profile)
    doc="end-to-end training-data pipeline in ONE Catalyst plan: exact-dedup "
    "keepers (G1) -> token-count quality gate + language ID (G4) -> per-source "
    "language rollup; the semi-join keeper prune runs BEFORE the expensive text "
    "profiling, so downstream cost tracks the deduped survivor set",
)
def pipeline_dedup_quality_lang(spark, sf):
    from esgopeta_spark.operators.dedup import exact_dedup
    from esgopeta_spark.operators.text import lang_guess, token_count

    d = T(spark, sf, "documents")
    keepers = exact_dedup(d)  # (doc_id) of each group's lowest-id survivor
    survivors = d.join(keepers, "doc_id", "left_semi")
    gated = survivors.filter(token_count(F.col("text")) >= 10)
    return gated.groupBy(
        "source", lang_guess(F.col("text")).alias("lang_guess")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
    )


REGISTRY["pipeline_dedup_quality_lang"].oracle = _pipeline_oracle()


@register(
    "chunk_documents_tokens",
    "G4,E8",
    """
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    w AS (
      SELECT doc_id,
             CASE WHEN length(norm) = 0 THEN [] ELSE string_split(norm, ' ') END AS words
      FROM n),
    c AS (
      SELECT doc_id, words, UNNEST(range(0, greatest(len(words), 1), 48)) AS start
      FROM w)
    SELECT doc_id,
           CAST(start // 48 AS INTEGER) AS chunk_id,
           md5(array_to_string(words[start + 1 : start + 64], ' ')) AS chunk_fp,
           CAST(greatest(least(64, len(words) - start), 0) AS INTEGER) AS n_tokens
    FROM c
    """,
    doc="token-bounded overlapping document chunking (chunk=64, overlap=16): the "
    "pre-tokenization shaping step of a training corpus; one projection + "
    "posexplode, zero shuffles; chunk text compared by md5 fingerprint to keep "
    "the gate output narrow",
)
def chunk_documents_tokens(spark, sf):
    from esgopeta_spark.operators.text import chunk_documents

    d = T(spark, sf, "documents")
    ch = chunk_documents(d, chunk_tokens=64, overlap=16)
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.md5("chunk_text").alias("chunk_fp"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )


@register(
    "text_redact_pii",
    "G4,E8",
    r"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
                 '\+?[0-9][0-9()\- ]{7,}[0-9]', '<phone>', 'g'),
                 'https?://[^ ]+', '<url>', 'g')) AS redacted_fp,
           CAST(length(text) - length(regexp_replace(regexp_replace(regexp_replace(
                 text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
                 '\+?[0-9][0-9()\- ]{7,}[0-9]', '<phone>', 'g'),
                 'https?://[^ ]+', '<url>', 'g')) AS BIGINT) AS bytes_removed
    FROM documents
    """,
    doc="PII scrubbing (email/phone/url -> tag tokens) in fixed pattern order; "
    "redacted text compared by md5 so the gate output stays narrow; "
    "bytes_removed is the per-doc scrub delta a pipeline monitors",
)
def text_redact_pii(spark, sf):
    from esgopeta_spark.operators.text import redact_pii

    d = T(spark, sf, "documents")
    red = redact_pii(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(red).alias("redacted_fp"),
        (F.length("text") - F.length(red)).cast("bigint").alias("bytes_removed"),
    )


@register(
    "text_repetition_profile",
    "G4,E8",
    """
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    w AS (
      SELECT doc_id,
             CASE WHEN length(norm) = 0 THEN [] ELSE string_split(norm, ' ') END AS words
      FROM n),
    g AS (
      SELECT doc_id,
             CASE WHEN len(words) - 2 > 0
                  THEN list_transform(range(1, len(words) - 1),
                                      i -> array_to_string(words[i : i + 2], ' '))
                  ELSE [] END AS grams
      FROM w)
    SELECT doc_id,
           CAST(len(grams) AS INTEGER) AS n_grams,
           CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct_grams,
           CAST(floor(CASE WHEN len(grams) > 0
                 THEN (len(grams) - len(list_distinct(grams))) / CAST(len(grams) AS DOUBLE)
                 ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS dup_gram_frac_micro
    FROM g
    """,
    doc="repeated-3-gram fraction per document (the boilerplate/spam quality rule): "
    "grams in one projection, duplicate fraction = 1 - distinct/total, micro-units "
    "for cross-engine hashing",
)
def text_repetition_profile(spark, sf):
    from esgopeta_spark.operators.text import repetition_profile

    d = T(spark, sf, "documents")
    out = repetition_profile(d, n=3)
    return out.select(
        "doc_id",
        "n_grams",
        "n_distinct_grams",
        micro(F.col("dup_gram_frac")).alias("dup_gram_frac_micro"),
    )


@register(
    "corpus_mix_sample",
    "G4,E2,E4",
    """
    WITH draws AS (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE)
               / 4294967296.0 AS draw,
             CASE WHEN source = 'src0' THEN 1.0
                  WHEN source = 'src1' THEN 0.5
                  WHEN source = 'src2' THEN 0.25
                  WHEN source = 'src3' THEN 0.1
                  ELSE 0.05 END AS rate
      FROM documents)
    SELECT source, COUNT(*) AS n_sampled
    FROM draws WHERE draw < rate
    GROUP BY source
    """,
    doc="deterministic stratified corpus-mixing sample: per-source keep rates, "
    "inclusion = md5(doc_id)-derived uniform draw < rate — seedless, rerun- and "
    "engine-stable so the oracle replays the exact sample; one codegen filter, "
    "no shuffle before the rollup",
)
def corpus_mix_sample(spark, sf):
    from esgopeta_spark.operators.text import stratified_sample

    d = T(spark, sf, "documents")
    sampled = stratified_sample(
        d, {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}, default_rate=0.05
    )
    return sampled.groupBy("source").agg(F.count("*").alias("n_sampled"))


@register(
    "decontaminate_ngram_overlap",
    "G4,G2,E3",
    """
    WITH n AS (
      SELECT doc_id, source, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    w AS (
      SELECT doc_id, source,
             CASE WHEN length(norm) = 0 THEN [] ELSE string_split(norm, ' ') END AS words
      FROM n),
    g AS (
      SELECT doc_id, source,
             CASE WHEN len(words) >= 3
                  THEN list_distinct(list_transform(range(0, len(words) - 3 + 1),
                                     i -> array_to_string(words[i + 1 : i + 3], ' ')))
                  ELSE [] END AS grams
      FROM w),
    corp AS (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE source <> 'src19'),
    ev AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE source = 'src19')
    SELECT corp.doc_id, CAST(COUNT(DISTINCT corp.gram) AS BIGINT) AS n_shared_grams
    FROM corp JOIN ev ON corp.gram = ev.gram
    GROUP BY corp.doc_id
    """,
    doc="benchmark decontamination: corpus docs (sources != src19) sharing any "
    "word 3-gram with the src19 eval slice, with the shared-gram count per doc; "
    "eval gram set broadcasts, corpus never shuffles for the probe "
    "(operators/text.contamination_overlap; hashed=False for the exact oracle, "
    "xxhash64 keys at scale)",
)
def decontaminate_ngram_overlap(spark, sf):
    from esgopeta_spark.operators.text import contamination_overlap

    d = T(spark, sf, "documents")
    corpus = d.filter(F.col("source") != "src19")
    eval_set = d.filter(F.col("source") == "src19")
    out = contamination_overlap(corpus, eval_set, n=3, hashed=False)
    return out.select("doc_id", F.col("n_shared_grams").cast("bigint").alias("n_shared_grams"))


@register(
    "text_inverted_index",
    "G4,E4,E8",
    """
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, UNNEST(string_split(norm, ' ')) AS token
      FROM n WHERE length(norm) > 0),
    tf AS (
      SELECT token, doc_id, COUNT(*) AS tf
      FROM tok GROUP BY token, doc_id)
    SELECT token,
           COUNT(*) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           md5(array_to_string(list_sort(array_agg(CAST(doc_id AS VARCHAR))), ',')) AS postings_fp
    FROM tf GROUP BY token
    """,
    doc="inverted-index build: token -> (document frequency, total term frequency, "
    "posting-list fingerprint).  Two partial-agg shuffles — (token, doc) term "
    "counts then per-token rollup; the posting list itself is order-canonicalized "
    "(sort) before fingerprinting so the hash is partition-order-free",
)
def text_inverted_index(spark, sf):
    from esgopeta_spark.operators.text import words

    d = T(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(words(F.col("text"))).alias("token"))
    tf = tok.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    return tf.groupBy("token").agg(
        F.count("*").alias("doc_freq"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.md5(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id").cast("string"))))
        ).alias("postings_fp"),
    )


@register(
    "corpus_adaptive_length_filter",
    "G4,E4,E3",
    """
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS cnt
      FROM documents),
    thr AS (
      SELECT source, n_chars AS t10 FROM ranked WHERE rn = cnt // 10)
    SELECT d.source,
           COUNT(*) AS n_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars_kept
    FROM documents d LEFT JOIN thr ON d.source = thr.source
    WHERE d.n_chars > COALESCE(thr.t10, -1)
    GROUP BY d.source
    """,
    doc="adaptive quality threshold: drop each source's shortest-decile docs, "
    "threshold LEARNED from the data instead of a global constant.  The "
    "threshold is RANK-derived in pure integers (the n_chars value at sorted "
    "position cnt DIV 10) — NOT an interpolated percentile, whose double "
    "interpolation formulas are not guaranteed bit-identical across engines "
    "and can flip membership of boundary docs (catalog determinism rules).  "
    "The tiny per-source threshold table broadcasts back onto the scan; "
    "sources with <10 docs keep everything (no threshold row, COALESCE -1)",
)
def corpus_adaptive_length_filter(spark, sf):
    d = T(spark, sf, "documents")
    ws = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(ws.orderBy(F.col("n_chars").asc())).alias("rn"),
        F.count("*").over(ws).alias("cnt"),
    )
    thr = ranked.filter(F.col("rn") == F.expr("cnt div 10")).select(
        "source", F.col("n_chars").alias("t10")
    )
    return (
        d.join(F.broadcast(thr), "source", "left")
        .filter(F.col("n_chars") > F.coalesce(F.col("t10"), F.lit(-1)))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").cast("bigint").alias("sum_chars_kept"))
    )


@register(
    "dedup_incremental_exact",
    "G1,E3",
    r"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'dup family ' || (doc_id % 17)
                  ELSE coalesce(text, '') || ' uniq ' || doc_id END AS t
      FROM documents
    ), n AS (
      SELECT doc_id, regexp_replace(lower(trim(t)), '\s+', ' ', 'g') AS k
      FROM d
    ), prior AS (
      SELECT k, MIN(doc_id) AS prior_keeper
      FROM n WHERE doc_id % 3 = 0 GROUP BY k
    ), im AS (
      SELECT doc_id, k, MIN(doc_id) OVER (PARTITION BY k) AS incr_min
      FROM n WHERE doc_id % 3 <> 0
    )
    SELECT im.doc_id,
           CASE WHEN prior_keeper IS NOT NULL THEN 'dup_prior'
                WHEN im.doc_id = incr_min THEN 'new'
                ELSE 'dup_incr' END AS status,
           CAST(coalesce(prior_keeper, incr_min) AS BIGINT) AS keeper_id
    FROM im LEFT JOIN prior ON im.k = prior.k
    """,
    doc="snapshot-incremental exact dedup (r11 — the operational 100 TB "
    "shape: only the crawl increment is new work, the full corpus never "
    "rescans): ids%3==0 are yesterday's store, the rest today's "
    "increment; id%5==0 docs share forced 'dup family' texts spanning "
    "both snapshots.  Prior ALWAYS wins (re-crawled dups never displace "
    "existing keepers — shard stability across snapshots), increment "
    "ties break to lowest id; every increment row gets a visible "
    "verdict (new / dup_prior / dup_incr) with its keeper.  Spark keys "
    "sha2-256 of normalized text, the oracle joins on the normalized "
    "text itself — equal up to a 256-bit collision.  Plan: prior "
    "collapses once to (hash, keeper) = the store you'd maintain "
    "anyway; ONE hash window + ONE hash-equi left join, work "
    "O(increment); operators/dedup.py incremental_dedup",
)
def dedup_incremental_exact(spark, sf):
    from esgopeta_spark.operators.dedup import incremental_dedup

    did = F.col("doc_id")
    t = F.when(
        did % 5 == 0,
        F.concat(F.lit("dup family "), (did % 17).cast("string")),
    ).otherwise(
        F.concat(F.coalesce(F.col("text"), F.lit("")),
                 F.lit(" uniq "), did.cast("string"))
    )
    d = T(spark, sf, "documents").select("doc_id", t.alias("text"))
    prior = d.where(did % 3 == 0)
    incr = d.where(did % 3 != 0)
    return incremental_dedup(prior, incr)
