"""Extended catalog: subqueries, pivot, percentiles, second function
batteries, lateral explode, and a tiebreak-stressing HAM query.  Same
determinism rules as catalog.py (see its module docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from esgopeta_spark.plans.catalog import T, money, pct, register


@register(
    "subquery_scalar_avg",
    "E2,E4",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders) * 1.5
    """,
    doc="scalar subquery: orders 1.5x above global average price",
)
def subquery_scalar_avg(spark, sf):
    o = T(spark, sf, "orders")
    avg_df = o.agg((F.sum(money("o_totalprice")).cast("double") / F.count("*")).alias("_avg"))
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("_avg") * 1.5)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "subquery_exists_bulk_parts",
    "E2,E3",
    """
    SELECT p_partkey, p_brand FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
    """,
    doc="correlated EXISTS == left-semi join",
)
def subquery_exists_bulk_parts(spark, sf):
    p, li = T(spark, sf, "part"), T(spark, sf, "lineitem")
    bulky = li.filter(F.col("l_quantity") > 45)
    return p.join(bulky, p.p_partkey == bulky.l_partkey, "left_semi").select("p_partkey", "p_brand")


@register(
    "subquery_in_region_customers",
    "E2,E3",
    """
    SELECT c_custkey FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (
        SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
    """,
    doc="nested IN subqueries == chained semi joins",
)
def subquery_in_region_customers(spark, sf):
    c, n, r = T(spark, sf, "customer"), T(spark, sf, "nation"), T(spark, sf, "region")
    eu = r.filter(F.col("r_name") == "EUROPE")
    eun = n.join(F.broadcast(eu), n.n_regionkey == eu.r_regionkey, "left_semi")
    return c.join(F.broadcast(eun), c.c_nationkey == eun.n_nationkey, "left_semi").select("c_custkey")


@register(
    "pivot_status_by_priority",
    "E4",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="pivot (explicit value list) == FILTERed counts in the oracle",
)
def pivot_status_by_priority(spark, sf):
    o = T(spark, sf, "orders")
    piv = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@register(
    "win_first_last_value",
    "E5",
    """
    SELECT o_custkey, o_orderkey,
           CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(o_totalprice) OVER w AS DOUBLE) AS last_price,
           CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first/last/nth value over an unbounded frame with unique order",
)
def win_first_last_value(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = T(spark, sf, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "str_funcs2_supplier",
    "E8",
    """
    SELECT s_suppkey,
           lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS key_padded,
           reverse(s_name) AS name_rev,
           repeat('ab', 3) AS rep,
           translate(s_name, 'aeiou', '.....') AS name_devoweled,
           left(s_name, 4) AS name_left,
           right(s_name, 3) AS name_right,
           sha256(s_name) AS name_sha
    FROM supplier
    """,
    doc="second string battery: lpad/reverse/repeat/translate/left/right/sha256",
)
def str_funcs2_supplier(spark, sf):
    s = T(spark, sf, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("key_padded"),
        F.reverse("s_name").alias("name_rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.translate("s_name", "aeiou", ".....").alias("name_devoweled"),
        F.expr("left(s_name, 4)").alias("name_left"),
        F.expr("right(s_name, 3)").alias("name_right"),
        F.sha2(F.col("s_name").cast("binary"), 256).alias("name_sha"),
    )


@register(
    "date_funcs2_orders",
    "E8",
    """
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(isodow(o_orderdate) AS INTEGER) AS order_isodow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS order_doy
    FROM orders
    """,
    doc="second date battery; ISO day-of-week aligns Spark weekday()+1 with DuckDB isodow",
)
def date_funcs2_orders(spark, sf):
    o = T(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.weekday("o_orderdate") + 1).alias("order_isodow"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.dayofyear("o_orderdate").alias("order_doy"),
    )


@register(
    "explode_part_words",
    "E8",
    """
    WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey, CAST(z[2] - 1 AS INTEGER) AS pos, CAST(z[1] AS VARCHAR) AS word
    FROM (SELECT p_partkey, unnest(list_zip(words, generate_series(1, len(words)))) AS z FROM w)
    """,
    doc="lateral explode with position (posexplode == unnest of a value/index zip)",
)
def explode_part_words(spark, sf):
    p = T(spark, sf, "part")
    return p.select("p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word"))


@register(
    "agg_median_price",
    "E4",
    """
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="exact interpolated percentiles (Spark percentile == DuckDB quantile_cont)",
)
def agg_median_price(spark, sf):
    o = T(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
    )


@register(
    "graph_ham_lexical_ties",
    "A10,D4",
    """
    WITH upd AS (
      SELECT 'user/' || CAST(user_id AS VARCHAR) AS soul,
             'latest_' || event_type AS field,
             event_type || '#' || CAST(event_id AS VARCHAR) AS sval,
             CAST(epoch_ms(ts) // 86400000 AS DOUBLE) AS state
      FROM events),
    r AS (
      SELECT soul, field, sval, state,
             ROW_NUMBER() OVER (PARTITION BY soul, field
                                ORDER BY state DESC, '"' || sval || '"' DESC) AS rn
      FROM upd)
    SELECT soul, field, sval AS value_string, state FROM r WHERE rn = 1
    """,
    doc="HAM merge under heavy state ties (day-truncated states): the lexical "
    "JSON tiebreak (gun/state.go:68-78) decides most keys — grades D4 directly",
)
def graph_ham_lexical_ties(spark, sf):
    from esgopeta_spark.ham import ham_merge

    e = T(spark, sf, "events")
    updates = e.select(
        F.concat(F.lit("user/"), F.col("user_id").cast("string")).alias("soul"),
        F.concat(F.lit("latest_"), F.col("event_type")).alias("field"),
        F.lit("string").alias("value_type"),
        F.lit(None).cast("string").alias("value_number_raw"),
        F.lit(None).cast("double").alias("value_number"),
        F.concat(F.col("event_type"), F.lit("#"), F.col("event_id").cast("string")).alias("value_string"),
        F.lit(None).cast("boolean").alias("value_bool"),
        F.lit(None).cast("string").alias("value_relation"),
        F.expr("CAST(unix_millis(ts) div 86400000 AS DOUBLE)").alias("state"),
    )
    return ham_merge(updates).select("soul", "field", "value_string", "state")


@register(
    "map_funcs_nation_map",
    "E8",
    """
    SELECT c_custkey, n_name AS nation_name,
           (SELECT COUNT(*) FROM nation) AS n_nations
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    doc="map functions (map_from_entries / element_at / map_keys): the nation dim "
    "folded into ONE map value and broadcast — a per-row map lookup replaces the "
    "join (the 'dimension as map literal' pattern for tiny dims); the oracle is the "
    "equivalent join, proving the lookup semantics",
)
def map_funcs_nation_map(spark, sf):
    n = T(spark, sf, "nation")
    nmap = n.agg(
        F.map_from_entries(F.collect_list(F.struct("n_nationkey", "n_name"))).alias("_m")
    )
    c = T(spark, sf, "customer").select("c_custkey", "c_nationkey")
    return (
        c.crossJoin(F.broadcast(nmap))
        .select(
            "c_custkey",
            F.element_at(F.col("_m"), F.col("c_nationkey")).alias("nation_name"),
            F.size(F.map_keys(F.col("_m"))).cast("bigint").alias("n_nations"),
        )
    )


@register(
    "win_percentrank_cumedist",
    "E5",
    """
    SELECT o_custkey, o_orderkey,
           CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS pr_micro,
           CAST(floor(cume_dist()    OVER w * 1000000 + 0.5) AS BIGINT) AS cd_micro
    FROM orders
    WHERE o_custkey % 10 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="percent_rank + cume_dist over a keyed window (unique total order per rule 4; "
    "micro-unit flooring per rule 3 — both are small-int ratios, exact either way)",
)
def win_percentrank_cumedist(spark, sf):
    from pyspark.sql.window import Window

    o = T(spark, sf, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.percent_rank().over(w) * 1000000.0 + 0.5).cast("bigint").alias("pr_micro"),
        F.floor(F.cume_dist().over(w) * 1000000.0 + 0.5).cast("bigint").alias("cd_micro"),
    )


@register(
    "sessionize_events_islands",
    "E5,E4,E8",
    """
    WITH marks AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marks)
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           epoch_us(MIN(ts)) AS start_us,
           epoch_us(MAX(ts)) AS end_us
    FROM sess GROUP BY user_id, session_no
    """,
    doc="batch sessionization by gaps-and-islands: lag marks 30-min gaps, a running "
    "sum numbers sessions, one aggregate summarizes them — the batch twin of the "
    "session_window streaming entry (F4), same session boundaries; unique per-user "
    "order (ts, event_id) per rule 4",
)
def sessionize_events_islands(spark, sf):
    from pyspark.sql.window import Window

    ev = T(spark, sf, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            # exact micros, not cast("long") (seconds, truncating): a gap of
            # 1800.5s must count as > 30 min on both engines
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1800 * 1000000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = marks.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )


@register(
    "dedup_keeper_assignment",
    "G1,E5",
    r"""
    SELECT doc_id,
           MIN(doc_id) OVER (
             PARTITION BY left(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 60)
           ) AS keeper_id
    FROM documents
    """,
    doc="dedup resolution end-to-end: every doc -> the smallest doc_id sharing its "
    "60-char normalized-prefix fingerprint (itself when unique; this corpus has "
    "prefix-dups but no byte-exact dups, so the prefix key is what actually "
    "collides) — the assignment a dedup pipeline joins back to drop non-keepers; "
    "window-min over the fingerprint, one shuffle (operators/dedup.py "
    "normalize_text; the near-dup generalization is dedup_keepers over LSH pairs, "
    "graded via dedup_embedding_components)",
)
def dedup_keeper_assignment(spark, sf):
    from pyspark.sql.window import Window

    from esgopeta_spark.operators.dedup import normalize_text

    d = T(spark, sf, "documents")
    w = Window.partitionBy(F.substring(normalize_text(F.col("text")), 1, 60))
    return d.select("doc_id", F.min("doc_id").over(w).alias("keeper_id"))


@register(
    "agg_collect_sorted_parts",
    "E4,E8",
    """
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_partkey)), ',') AS parts,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_orderkey
    """,
    doc="collect_list aggregation made deterministic: the collected set is sorted "
    "then joined to one string (collection order is partition-dependent; array_sort "
    "fixes it; projection to string follows this catalog's array-output convention)",
)
def agg_collect_sorted_parts(spark, sf):
    li = T(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("l_partkey")), lambda x: x.cast("string")),
            ",",
        ).alias("parts"),
        F.count("*").alias("n_items"),
    )


@register(
    "unpivot_lineitem_measures",
    "E4,E8",
    """
    SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS amount
    FROM lineitem WHERE l_orderkey % 20 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey % 20 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey % 20 = 0
    """,
    doc="unpivot (wide -> long): three measure columns melted to (measure, amount) "
    "rows — the inverse of pivot_status_by_priority; oracle is the UNION ALL "
    "desugaring; per-row passthrough so values hash exactly",
)
def unpivot_lineitem_measures(spark, sf):
    li = T(spark, sf, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    )


@register(
    "pred_like_nullsafe",
    "E2",
    """
    SELECT p_partkey,
           p_name LIKE '%green%' AS has_green,
           p_name NOT LIKE 'a%' AS not_a_start,
           (NULLIF(p_brand, 'Brand#13') IS NOT DISTINCT FROM NULLIF(p_type, 'ECONOMY'))
             AS brand13_and_economy
    FROM part WHERE p_name LIKE '%o%'
    """,
    doc="predicate battery: LIKE / NOT LIKE pushed to the scan, and null-safe "
    "equality (<=> / IS NOT DISTINCT FROM) over NULLIF-constructed nulls — true "
    "exactly when both sides null out (Brand#13 ECONOMY parts)",
)
def pred_like_nullsafe(spark, sf):
    p = T(spark, sf, "part").filter(F.col("p_name").like("%o%"))
    return p.select(
        "p_partkey",
        F.col("p_name").like("%green%").alias("has_green"),
        (~F.col("p_name").like("a%")).alias("not_a_start"),
        F.nullif(F.col("p_brand"), F.lit("Brand#13"))
        .eqNullSafe(F.nullif(F.col("p_type"), F.lit("ECONOMY")))
        .alias("brand13_and_economy"),
    )


@register(
    "agg_approx_percentile",
    "E4",
    None,  # approximate by design: driver records rows-only; pytest checks tolerance vs exact
    doc="approx_percentile (t-digest-style sketch): the 100TB-scale variant of "
    "agg_median_price — single pass, mergeable partials, no full sort",
)
def agg_approx_percentile(spark, sf):
    o = T(spark, sf, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", 0.5, 10000).alias("median_approx"),
        F.approx_percentile("o_totalprice", 0.9, 10000).alias("p90_approx"),
    )


@register(
    "sql_recursive_hierarchy_rollup",
    "E2,A1",
    """
    WITH RECURSIVE
    edges AS (
      SELECT 'root' AS parent, 'r' || CAST(r_regionkey AS VARCHAR) AS child FROM region
      UNION ALL
      SELECT 'r' || CAST(n_regionkey AS VARCHAR), 'n' || CAST(n_nationkey AS VARCHAR) FROM nation
      UNION ALL
      SELECT 'n' || CAST(c_nationkey AS VARCHAR), 'c' || CAST(c_custkey AS VARCHAR) FROM customer),
    walk AS (
      SELECT 'root' AS node, 0 AS depth
      UNION ALL
      SELECT e.child, w.depth + 1 FROM walk w JOIN edges e ON e.parent = w.node)
    SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes
    FROM walk GROUP BY depth
    """,
    doc="recursive SQL executed BY SPARK ITSELF (WITH RECURSIVE landed in Spark "
    "4.x; UNION ALL body, tree-shaped edges so each node is reached exactly "
    "once and the recursion terminates without dedup): descend the "
    "root->region->nation->customer hierarchy and roll up node counts per "
    "depth.  The engine's declared SQL surface includes recursion — the same "
    "query text runs on the DuckDB oracle; the iterative DataFrame twins "
    "(shortest_hops, dup_components) remain the scale path for graphs with "
    "cycles, where UNION ALL recursion would enumerate paths, not nodes",
)
def sql_recursive_hierarchy_rollup(spark, sf):
    for t in ("region", "nation", "customer"):
        T(spark, sf, t).createOrReplaceTempView(f"_rcte_{t}")
    return spark.sql(
        """
        WITH RECURSIVE
        edges AS (
          SELECT 'root' AS parent, 'r' || CAST(r_regionkey AS STRING) AS child FROM _rcte_region
          UNION ALL
          SELECT 'r' || CAST(n_regionkey AS STRING), 'n' || CAST(n_nationkey AS STRING) FROM _rcte_nation
          UNION ALL
          SELECT 'n' || CAST(c_nationkey AS STRING), 'c' || CAST(c_custkey AS STRING) FROM _rcte_customer),
        walk AS (
          SELECT 'root' AS node, 0 AS depth
          UNION ALL
          SELECT e.child, w.depth + 1 FROM walk w JOIN edges e ON e.parent = w.node)
        SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_nodes
        FROM walk GROUP BY depth
        """
    )


@register(
    "text_ngram_commonness",
    "G4",
    """
    WITH d AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents),
    g AS (
      SELECT doc_id, array_to_string(w[i : i + 1], ' ') AS gram
      FROM (SELECT doc_id, w, UNNEST(range(1, len(w))) AS i
            FROM d WHERE len(w) >= 2)),
    f AS (SELECT gram, COUNT(*) AS freq FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(f.freq) AS BIGINT) AS sum_freq,
           CAST(SUM(f.freq) * 100 // COUNT(*) AS BIGINT) AS mean_freq_c
    FROM g JOIN f USING (gram)
    GROUP BY g.doc_id
    """,
    doc="corpus-statistics quality proxy (integer-exact cousin of CCNet's "
    "LM-perplexity filter, Wenzek et al. 2020): per-doc mean corpus frequency "
    "of its word bigrams — junk/gibberish docs score low, fluent prose high.  "
    "One explode -> global gram-count shuffle -> count join -> per-doc agg, "
    "all exact integer counts (operators/text.ngram_commonness)",
)
def text_ngram_commonness(spark, sf):
    from esgopeta_spark.operators.text import ngram_commonness

    return ngram_commonness(T(spark, sf, "documents"), n=2)


@register(
    "agg_kmv_distinct_sketch",
    "E4",
    """
    WITH h AS (
      SELECT DISTINCT o_orderpriority,
             ((((CAST(o_custkey AS BIGINT) % 2147483647 + 2147483647) % 2147483647)
               * 48271) % 2147483647 * 69621) % 2147483647 + 1 AS hh
      FROM orders),
    r AS (
      SELECT o_orderpriority, hh,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY hh ASC) AS rn
      FROM h)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(COALESCE(
             (63 * CAST(2147483647 AS BIGINT))
                  // MAX(CASE WHEN rn = 64 THEN hh END),
             COUNT(*)) AS BIGINT) AS est_distinct
    FROM r WHERE rn <= 64
    GROUP BY o_orderpriority
    """,
    doc="KMV (k-minimum-values) distinct sketch, k=64, per order priority: "
    "the approximate-distinct whose ENTIRE state is portable integer "
    "arithmetic (two Lehmer scramble rounds mod 2^31-1, estimate "
    "(k-1)*M div h_k) "
    "— unlike HLL it is oracle-hash-exact, and the k-smallest state is "
    "mergeable so only k values per group cross a shuffle at scale "
    "(operators/sketches.kmv_distinct; mergeability pinned in pytest)",
)
def agg_kmv_distinct_sketch(spark, sf):
    from esgopeta_spark.operators.sketches import kmv_distinct

    return kmv_distinct(T(spark, sf, "orders"), "o_custkey", ["o_orderpriority"], k=64)


@register(
    "funnel_view_click_purchase",
    "E4,E5",
    """
    WITH s1 AS (
      SELECT user_id, MIN(CAST(epoch_ms(ts) AS BIGINT)) AS t
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(CAST(epoch_ms(e.ts) AS BIGINT)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND CAST(epoch_ms(e.ts) AS BIGINT) > s1.t
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(CAST(epoch_ms(e.ts) AS BIGINT)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND CAST(epoch_ms(e.ts) AS BIGINT) > s2.t
      GROUP BY e.user_id)
    SELECT 1 AS stage_idx, 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    """,
    doc="ordered view->click->purchase funnel conversion (product-analytics "
    "staple): stage k counts users with a stage-k event strictly after "
    "their earliest qualifying stage-(k-1) event.  One filtered "
    "partial-agg pass + narrow (user, ts) join per stage, each stage "
    "lineage-cut — no windows, no arrays, no per-user state "
    "(operators/funnel.funnel_stages)",
)
def funnel_view_click_purchase(spark, sf):
    from esgopeta_spark.operators.funnel import funnel_stages

    return funnel_stages(T(spark, sf, "events"), ["view", "click", "purchase"])


@register(
    "agg_cms_heavy_hitters",
    "E4,G4",
    """
    WITH grid AS (
      SELECT t.d AS cms_row,
             (((((CAST(user_id AS BIGINT) % 2147483647 + 2147483647) % 2147483647)
                * 48271) % 2147483647 * (69621 + t.d)) % 2147483647) % 256 AS cms_bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events CROSS JOIN generate_series(0, 3) t(d)
      GROUP BY 1, 2),
    probes AS (
      SELECT DISTINCT user_id FROM events),
    p AS (
      SELECT probes.user_id, t.d AS cms_row,
             (((((CAST(user_id AS BIGINT) % 2147483647 + 2147483647) % 2147483647)
                * 48271) % 2147483647 * (69621 + t.d)) % 2147483647) % 256 AS cms_bucket
      FROM probes CROSS JOIN generate_series(0, 3) t(d)),
    est AS (
      SELECT p.user_id,
             CAST(MIN(COALESCE(grid.cnt, 0)) AS BIGINT) AS est_cnt
      FROM p LEFT JOIN grid USING (cms_row, cms_bucket)
      GROUP BY p.user_id)
    SELECT user_id, est_cnt FROM est
    WHERE est_cnt >= (SELECT COUNT(*) FROM events) // 100
    """,
    doc="Count-Min-sketch heavy hitters (Cormode & Muthukrishnan 2005): "
    "4x256 exact-int64 counter grid (same Lehmer hash family as the KMV "
    "sketch, row index offsets the second multiplier), point estimate = "
    "min over rows, keep users whose estimated event count >= total div "
    "100 (scale-free threshold).  CMS never under-counts so no true "
    "heavy hitter is missed; the grid shuffles at most depth*width rows "
    "per map partition (mergeable: counter sums) and broadcasts to the "
    "probe join (operators/sketches.cms_estimates; mergeability + "
    "overcount bounds pinned in pytest)",
)
def agg_cms_heavy_hitters(spark, sf):
    from esgopeta_spark.operators.sketches import cms_estimates

    ev = T(spark, sf, "events")
    est = cms_estimates(ev, ev.select("user_id"), "user_id", depth=4, width=256)
    tot = ev.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        est.crossJoin(F.broadcast(tot))
        .filter(F.col("est_cnt") >= F.expr("_tot div 100"))
        .select("user_id", "est_cnt")
    )


@register(
    "ts_gapfill_daily_locf",
    "E5,F3",
    """
    WITH obs AS (
      SELECT user_id, day, value AS day_value, cnt AS n_events FROM (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)) AS cnt
        FROM events) WHERE rn = 1),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY user_id),
    grid AS (
      SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds)
    SELECT g.user_id,
           g.day AS bucket,
           LAST_VALUE(o.day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           CAST(COALESCE(o.n_events, 0) AS BIGINT) AS n_events,
           CAST(CASE WHEN o.day IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_gap
    FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
    """,
    doc="time-series resample + LOCF gap fill (the time_bucket_gapfill/locf "
    "staple): per-user daily grid over the user's own span, each bucket "
    "carrying the last observed value at or before it (closing value picked "
    "under the (ts, event_id) total order; doubles carried, never summed).  "
    "One bucket partial agg + output-bound sequence/explode grid + one "
    "last(ignorenulls) running window per series "
    "(operators/timeseries.resample_locf)",
)
def ts_gapfill_daily_locf(spark, sf):
    from esgopeta_spark.operators.timeseries import resample_locf

    return resample_locf(T(spark, sf, "events"))


@register(
    "ts_anomaly_zscore",
    "E4,E5",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_cents
      FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1, 2),
    st AS (
      SELECT user_id, day, total_cents,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_base,
             CAST(SUM(total_cents) OVER w AS BIGINT) AS s1,
             CAST(SUM(total_cents * total_cents) OVER w AS BIGINT) AS s2
      FROM daily
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
    zs AS (
      SELECT user_id, day, total_cents, n_base,
             CASE WHEN n_base >= 4
                   AND CAST(s2 AS DOUBLE) / CAST(n_base AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n_base AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n_base AS DOUBLE)) > 0
             THEN CAST(floor(
                    (CAST(total_cents AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n_base AS DOUBLE))
                    / sqrt(CAST(s2 AS DOUBLE) / CAST(n_base AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) / CAST(n_base AS DOUBLE))
                             * (CAST(s1 AS DOUBLE) / CAST(n_base AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT)
             END AS z_micro
      FROM st)
    SELECT user_id, day, total_cents, n_base, z_micro,
           CAST(CASE WHEN z_micro IS NOT NULL AND abs(z_micro) >= 2000000
                     THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
    FROM zs
    """,
    doc="rolling z-score anomaly detection over per-user DAILY spend (the "
    "time-series-monitoring staple): trailing 7-row baseline, mean/sd "
    "derived from exact integer cent sums in an identical IEEE op "
    "sequence both engines (rules 1-3), |z| >= 2 flags.  One daily "
    "partial agg + one per-key window sort "
    "(operators/timeseries.rolling_zscore)",
)
def ts_anomaly_zscore(spark, sf):
    from esgopeta_spark.operators.timeseries import rolling_zscore

    return rolling_zscore(T(spark, sf, "events"))


@register(
    "ts_ewma_daily",
    "E4,E5,E9",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_cents
      FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1, 2),
    seq AS (
      SELECT user_id, day, total_cents,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM daily),
    ew AS (
      SELECT user_id, day, total_cents, rn, total_cents AS ewma_cents
      FROM seq WHERE rn = 1
      UNION ALL
      -- FLOOR division (Python // in the Spark-side kernel): DuckDB's
      -- integer // TRUNCATES toward zero on negatives (measured:
      -- -5355//10 = -535), so subtract the non-negative mod first —
      -- the numerator becomes exactly divisible and trunc == floor
      SELECT seq.user_id, seq.day, seq.total_cents, seq.rn,
             CAST(((300 * seq.total_cents + 700 * ew.ewma_cents)
                   - (((300 * seq.total_cents + 700 * ew.ewma_cents) % 1000
                       + 1000) % 1000)) // 1000 AS BIGINT)
      FROM seq JOIN ew ON seq.user_id = ew.user_id AND seq.rn = ew.rn + 1)
    SELECT user_id, day, total_cents, ewma_cents,
           CAST(total_cents - ewma_cents AS BIGINT) AS dev_cents
    FROM ew
    """,
    doc="exponentially-weighted moving average over per-user daily spend "
    "(alpha=0.3) in EXACT integer arithmetic: s_t = (300*x_t + 700*s_{t-1}) "
    "floordiv 1000 — the trend-smoothing staple next to the z-score spike "
    "detector.  The recursion has no closed window form: Spark runs ONE "
    "Arrow applyInPandas per series key (Python // FLOORS), the oracle the "
    "identical recurrence as a RECURSIVE CTE with division floored via the "
    "non-negative-mod idiom (DuckDB integer // truncates on negatives, "
    "r9-measured).  One "
    "daily partial agg + one grouped Arrow pass "
    "(operators/timeseries.ewma_smooth)",
)
def ts_ewma_daily(spark, sf):
    from esgopeta_spark.operators.timeseries import ewma_smooth

    return ewma_smooth(T(spark, sf, "events"))


@register(
    "ts_holt_trend_daily",
    "E4,E5,E9",
    """
    WITH RECURSIVE daily AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_cents
      FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1, 2),
    seq AS (
      SELECT user_id, day, total_cents,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM daily),
    hw AS (
      SELECT user_id, day, total_cents, rn,
             total_cents AS level_cents, CAST(0 AS BIGINT) AS trend_cents
      FROM seq WHERE rn = 1
      UNION ALL
      -- FLOOR division via the non-negative-mod idiom (see ts_ewma_daily:
      -- DuckDB integer // truncates on negatives, the kernel floors);
      -- the level lands in a derived table so the trend update reads it
      SELECT user_id, day, total_cents, rn, lvl,
             CAST(((100 * (lvl - prev_level) + 900 * prev_trend)
                   - (((100 * (lvl - prev_level) + 900 * prev_trend) % 1000
                       + 1000) % 1000)) // 1000 AS BIGINT)
      FROM (
        SELECT seq.user_id, seq.day, seq.total_cents, seq.rn,
               hw.level_cents AS prev_level, hw.trend_cents AS prev_trend,
               CAST(((300 * seq.total_cents
                      + 700 * (hw.level_cents + hw.trend_cents))
                     - (((300 * seq.total_cents
                          + 700 * (hw.level_cents + hw.trend_cents)) % 1000
                         + 1000) % 1000)) // 1000 AS BIGINT) AS lvl
        FROM seq JOIN hw ON seq.user_id = hw.user_id AND seq.rn = hw.rn + 1) s)
    SELECT user_id, day, total_cents, level_cents, trend_cents,
           CAST(level_cents + trend_cents AS BIGINT) AS forecast_next_cents
    FROM hw
    """,
    doc="Holt double-exponential smoothing over per-user daily spend "
    "(alpha=0.3, beta=0.1) in EXACT integer arithmetic — level + trend "
    "coupled recursion, forecast_next = level + trend (the one-step-ahead "
    "prediction for residual monitoring).  Same discipline as ts_ewma_daily: "
    "one grouped Arrow pass per series vs the identical RECURSIVE CTE, "
    "oracle divisions floored via the non-negative-mod idiom (trends go "
    "negative routinely; DuckDB // truncates there while Python // floors — "
    "this entry exposed the divergence).  One daily partial agg + one "
    "grouped Arrow pass "
    "(operators/timeseries.holt_trend)",
)
def ts_holt_trend_daily(spark, sf):
    from esgopeta_spark.operators.timeseries import holt_trend

    return holt_trend(T(spark, sf, "events"))


@register(
    "stream_cms_grid_hourly",
    "F3,E4",
    """
    SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS w_start_ms,
           t.d AS cms_row,
           (((((CAST(user_id AS BIGINT) % 2147483647 + 2147483647) % 2147483647)
              * 48271) % 2147483647 * (69621 + t.d)) % 2147483647) % 256 AS cms_bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events CROSS JOIN generate_series(0, 3) t(d)
    GROUP BY 1, 2, 3
    """,
    doc="Count-Min sketch state per hourly event-time window — the "
    "STREAMING heavy-hitters shape (batch form graded; batch ≡ stream "
    "over the same function pinned in tests/test_streaming.py): each "
    "window holds a mergeable 4x256 int64 grid, watermark-bounded "
    "windowed count agg is the only stateful operator "
    "(streaming/windows.windowed_cms_state)",
)
def stream_cms_grid_hourly(spark, sf):
    from esgopeta_spark.streaming.windows import windowed_cms_state

    return windowed_cms_state(T(spark, sf, "events"))


@register(
    "join_bloom_semi_lineitem",
    "E3",
    """
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
    GROUP BY l_suppkey
    """,
    doc="Bloom-prefiltered semi-join (the explicit-operator form of runtime "
    "filter pushdown): the selective supplier set's keys hash into an "
    "8192-bit deterministic Bloom bitmask (same Lehmer family as KMV/CMS), "
    "pushed as a pure codegen prefilter on the lineitem scan BEFORE the "
    "exact broadcast semi-join — no false negatives, so the result equals "
    "the plain semi-join the oracle runs, but at 100 TB the fact table "
    "only feeds the join with rows that might match "
    "(operators/sketches.bloom_semi_join; mask = bounded driver state, "
    "same envelope as assign_cells' codebook)",
)
def join_bloom_semi_lineitem(spark, sf):
    from esgopeta_spark.operators.sketches import bloom_semi_join

    li = T(spark, sf, "lineitem")
    s = T(spark, sf, "supplier").filter(F.col("s_acctbal") > 5000)
    kept = bloom_semi_join(li, s, "l_suppkey", "s_suppkey")
    return kept.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) * 100)
        .cast("bigint")
        .alias("revenue_cents"),
    )


@register(
    "agg_histogram_quantiles",
    "E4",
    """
    WITH c AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
      FROM lineitem WHERE l_extendedprice IS NOT NULL),
    b AS (SELECT MIN(v) AS lo, MAX(v) AS hi, CAST(COUNT(*) AS BIGINT) AS n FROM c),
    bins AS (
      SELECT LEAST(255, ((c.v - b.lo) * 256) // (b.hi - b.lo + 1)) AS bin,
             b.lo, b.hi, b.n, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c, b GROUP BY 1, 2, 3, 4),
    cum AS (
      SELECT bin, lo, hi, n,
             SUM(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cm
      FROM bins),
    pick AS (
      SELECT q, (SELECT MIN(bin) FROM cum
                 WHERE cm >= (cum2.n * q + 999) // 1000) AS bin,
             lo, hi
      FROM (SELECT DISTINCT lo, hi, n FROM cum) cum2,
           (SELECT UNNEST([250, 500, 750, 990]) AS q))
    SELECT CAST(q AS INTEGER) AS q_permille,
           CAST(lo + (bin * (hi - lo + 1)) // 256 AS BIGINT) AS est_cents,
           CAST((hi - lo + 1) // 256 AS BIGINT) AS bin_width_cents
    FROM pick
    """,
    doc="histogram quantile sketch (the mergeable quantile-family companion "
    "to KMV/CMS): 256 equi-width integer-cent bins over the exact "
    "[min,max] range, estimate = covering bin's lower bound at ceil(q*N) "
    "cumulative count — all integer div arithmetic, so unlike "
    "approx_percentile's engine-internal GK/KLL state the whole sketch is "
    "oracle-hash-exact; bin counts merge by sum (<= 256 rows survive any "
    "partition) (operators/sketches.histogram_quantiles)",
)
def agg_histogram_quantiles(spark, sf):
    from esgopeta_spark.operators.sketches import histogram_quantiles

    return histogram_quantiles(
        T(spark, sf, "lineitem"), "l_extendedprice", [250, 500, 750, 990]
    )


@register(
    "text_domain_affinity_dsir",
    "G4,E4",
    """
    WITH n AS (
      SELECT doc_id, lang = 'de' AS tgt,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    w AS (SELECT doc_id, tgt, string_split(norm, ' ') AS ws FROM n),
    g AS (
      SELECT doc_id, tgt,
             CAST(CAST(('0x' || substr(md5(array_to_string(ws[i : i + 1], ' ')), 1, 8))
                  AS UBIGINT) AS BIGINT) % 512 AS b
      FROM (SELECT doc_id, tgt, ws, UNNEST(range(1, len(ws))) AS i
            FROM w WHERE len(ws) >= 2)),
    r AS (
      SELECT b, (COUNT(*) FILTER (WHERE tgt)) * 1000000 // COUNT(*) AS ratio
      FROM g GROUP BY b)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(r.ratio) // COUNT(*) AS BIGINT) AS affinity_micro
    FROM g JOIN r USING (b)
    GROUP BY g.doc_id
    """,
    doc="DSIR-shaped domain-affinity scoring (Xie et al. 2023, "
    "arXiv:2302.03169): hashed-bigram profile match against the German "
    "target subset, integer ratio arithmetic standing in for the paper's "
    "log-space weights (transcendental logs round differently across "
    "engines — documented deviation).  One gram projection -> one "
    "<= 512-row bucket agg -> broadcast ratio join -> per-doc agg "
    "(operators/text.domain_affinity)",
)
def text_domain_affinity_dsir(spark, sf):
    from esgopeta_spark.operators.text import domain_affinity

    return domain_affinity(T(spark, sf, "documents"), F.col("lang") == "de")


@register(
    "text_top_terms_tfidf",
    "G4,E5",
    """
    WITH occ AS (
      SELECT doc_id,
             UNNEST(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
      FROM documents),
    occ2 AS (SELECT doc_id, term FROM occ WHERE term <> ''),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM occ2 GROUP BY 1, 2),
    dfc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM occ2),
    s AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
             CAST(tf.tf * ((nd.n * 1000000) // dfc.df) AS BIGINT) AS score
      FROM tf JOIN dfc USING (term), nd),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, term ASC) AS rank
          FROM s)
    SELECT doc_id, term, tf, df, score, CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= 3
    """,
    doc="per-document top-3 salient terms by integer-exact TF-IDF "
    "(tf * micro-scaled inverse document-frequency RATIO — plain ratio "
    "instead of log-idf, which is not identically rounded across engines; "
    "same df-monotone ranking).  Occurrence projection -> (doc,term) tf "
    "agg -> vocabulary df agg broadcast back -> per-doc top-k window, "
    "ties broken by term (total order) "
    "(operators/text.top_terms_tfidf)",
)
def text_top_terms_tfidf(spark, sf):
    from esgopeta_spark.operators.text import top_terms_tfidf

    return top_terms_tfidf(T(spark, sf, "documents"), k=3)


@register(
    "text_compression_ratio",
    "G4",
    None,  # zlib exists in no SQL engine: rows-only; behavior pinned in pytest
    doc="per-document zlib compression ratio (integer micro) — the classic "
    "repetitiveness/quality signal corpus filters threshold on "
    "(templated/repeated text compresses far below natural prose).  "
    "Deterministic at fixed level; Arrow kernel, zero shuffle "
    "(operators/text.compression_ratio; monotone-repetition property and "
    "empty-doc NULL pinned in tests/test_llm_ops.py)",
)
def text_compression_ratio(spark, sf):
    from esgopeta_spark.operators.text import compression_ratio

    return compression_ratio(T(spark, sf, "documents"))


@register(
    "corpus_sample_k_per_source",
    "G4,E5",
    """
    SELECT source, doc_id, CAST(rn AS INTEGER) AS sample_rank
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                         doc_id ASC) AS rn
      FROM documents)
    WHERE rn <= 5
    """,
    doc="deterministic 5-per-source corpus sample (eval-set construction): "
    "rows rank by md5(id) within their stratum — a uniform portable "
    "pseudo-random order, id tiebreak = total order — so the same corpus "
    "yields the same sample on any engine or partitioning "
    "(operators/text.sample_k_per_group; COUNT-exact companion to "
    "stratified_sample's RATE-based mixing)",
)
def corpus_sample_k_per_source(spark, sf):
    from esgopeta_spark.operators.text import sample_k_per_group

    return sample_k_per_group(T(spark, sf, "documents"), k=5)


def _holt_winters_oracle(a: int = 300, b: int = 100, g: int = 200, m: int = 7) -> str:
    """RECURSIVE-CTE twin of operators/timeseries.holt_winters: the
    identical integer recursion with every division floored via the
    non-negative-mod idiom and the seasonal array carried as m columns
    through the recursion (phase = calendar epoch-day mod m)."""

    def fd(e: str) -> str:
        return (f"CAST((({e}) - ((({e}) % 1000 + 1000) % 1000)) // 1000"
                " AS BIGINT)")

    def scase(prefix: str, pexpr: str) -> str:
        whens = " ".join(f"WHEN {i} THEN {prefix}s{i}" for i in range(m))
        return f"CASE {pexpr} {whens} END"

    zeros = ", ".join(f"CAST(0 AS BIGINT) AS s{i}" for i in range(m))
    hw_s = ", ".join(f"hw.s{i} AS s{i}" for i in range(m))
    upd = ", ".join(f"CASE WHEN p = {i} THEN snew ELSE s{i} END"
                    for i in range(m))
    pday = f"(seq.day - DATE '1970-01-01') % {m}"
    pout = f"(day - DATE '1970-01-01') % {m}"
    lvl = fd(f"{a} * (total_cents - sp) + {1000 - a} * (prev_level + prev_trend)")
    trend = fd(f"{b} * (lvl - prev_level) + {1000 - b} * prev_trend")
    snew = fd(f"{g} * (total_cents - lvl) + {1000 - g} * sp")
    return f"""
    WITH RECURSIVE daily AS (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS total_cents
      FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1, 2),
    seq AS (
      SELECT user_id, day, total_cents,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM daily),
    hw AS (
      SELECT user_id, day, total_cents, rn,
             total_cents AS level_cents, CAST(0 AS BIGINT) AS trend_cents,
             {zeros}
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT user_id, day, total_cents, rn, lvl, {trend}, {upd}
      FROM (
        SELECT *, {snew} AS snew
        FROM (
          SELECT *, {lvl} AS lvl
          FROM (
            SELECT seq.user_id AS user_id, seq.day AS day,
                   seq.total_cents AS total_cents, seq.rn AS rn,
                   hw.level_cents AS prev_level, hw.trend_cents AS prev_trend,
                   {hw_s}, {pday} AS p,
                   {scase("hw.", pday)} AS sp
            FROM seq JOIN hw ON seq.user_id = hw.user_id AND seq.rn = hw.rn + 1
          ) q1
        ) q2
      ) q3)
    SELECT user_id, day, total_cents, level_cents, trend_cents,
           {scase("", pout)} AS seasonal_cents,
           CAST(level_cents + trend_cents
                + {scase("", f"(({pout}) + 1) % {m}")} AS BIGINT)
             AS forecast_next_cents
    FROM hw
    """


@register(
    "ts_holt_winters_daily",
    "E4,E5,E9",
    _holt_winters_oracle(),
    doc="Holt-Winters ADDITIVE seasonal smoothing over per-user daily "
    "spend (alpha=0.3, beta=0.1, gamma=0.2, weekly period) in EXACT "
    "integer arithmetic — level + trend + a day-of-week seasonal array "
    "keyed by CALENDAR phase (epoch-day mod 7, so gapped series stay "
    "phase-aligned), phases warming up from the additive-neutral 0; "
    "forecast_next = level + trend + next phase's post-update seasonal "
    "(the one-step-ahead prediction with weekly rhythm).  Same "
    "engine-exactness discipline as ts_holt_trend_daily: one "
    "key-sorted Arrow pass vs the identical RECURSIVE CTE carrying the "
    "seasonal array as 7 columns, every oracle division floored via "
    "the non-negative-mod idiom.  One daily partial agg + one grouped "
    "Arrow pass (operators/timeseries.holt_winters)",
)
def ts_holt_winters_daily(spark, sf):
    from esgopeta_spark.operators.timeseries import holt_winters

    return holt_winters(T(spark, sf, "events"))


@register(
    "io_compaction_plan",
    "E1,E5",
    r"""
    WITH f AS (
      SELECT o_orderpriority AS part, o_orderkey AS file_id,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS bytes
      FROM orders
    ), p AS (
      SELECT part, file_id, bytes,
             coalesce(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS before
      FROM f
    ), g AS (
      SELECT part, file_id, bytes,
             (before - (before % 50000000)) // 50000000 AS merge_group
      FROM p
    )
    SELECT part, file_id, bytes, CAST(merge_group AS BIGINT) AS merge_group,
           CAST(SUM(bytes) OVER (PARTITION BY part, merge_group) AS BIGINT)
             AS group_bytes,
           CAST(COUNT(*) OVER (PARTITION BY part, merge_group) AS BIGINT)
             AS group_files,
           CAST(CASE WHEN COUNT(*) OVER (PARTITION BY part, merge_group) = 1
                      AND bytes >= 50000000 THEN 1 ELSE 0 END AS INTEGER)
             AS already_compact
    FROM g
    """,
    doc="small-file compaction planning (r11 — the nightly table-"
    "maintenance op of every 100 TB lakehouse: streaming commits leave "
    "KB-scale files that scans pay per-open for): within each "
    "partition, files pack greedily in deterministic id order by the "
    "pure-window quotient merge_group = running_sum_before div target "
    "— every group lands within one file of the target, NO sequential "
    "driver state; emits the work order (group bytes/file counts, "
    "already-compact markers).  Fixture treats orders as the manifest "
    "(priority = partition, totalprice cents = file bytes, 50 MB "
    "target).  Oracle runs the identical window arithmetic.  Plan: two "
    "windows on the manifest's natural clustering — manifests are "
    "rows-about-files, so this costs nothing at any table size; "
    "sources/io.py compaction_plan",
)
def io_compaction_plan(spark, sf):
    from esgopeta_spark.sources.io import compaction_plan

    f = T(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("part"),
        F.col("o_orderkey").alias("file_id"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint").alias("bytes"),
    )
    return compaction_plan(f, target_bytes=50_000_000)


@register(
    "sketch_kmv_overlap",
    "E4,G1",
    """
    WITH keys AS (
      SELECT 'a' AS side, doc_id AS key FROM documents WHERE doc_id % 4 < 3
      UNION ALL
      SELECT 'b', doc_id FROM documents WHERE doc_id % 4 > 0),
    h AS (
      SELECT DISTINCT side,
             ((((CAST(key AS BIGINT) % 2147483647 + 2147483647) % 2147483647)
               * 48271) % 2147483647 * 69621) % 2147483647 + 1 AS hh
      FROM keys),
    st AS (
      SELECT side, hh,
             ROW_NUMBER() OVER (PARTITION BY side ORDER BY hh ASC) AS rn
      FROM h),
    kept AS (SELECT side, hh FROM st WHERE rn <= 64),
    m AS (
      SELECT hh, ROW_NUMBER() OVER (ORDER BY hh ASC) AS mr
      FROM (SELECT DISTINCT hh FROM kept)),
    mk AS (SELECT hh, mr FROM m WHERE mr <= 64),
    ns AS (SELECT hh, COUNT(DISTINCT side) AS nsides FROM kept GROUP BY hh),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_merged,
             CAST(SUM(CASE WHEN nsides = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS shared,
             CAST(COALESCE(
               (63 * CAST(2147483647 AS BIGINT))
                 // MAX(CASE WHEN mr = 64 THEN hh END),
               COUNT(*)) AS BIGINT) AS union_est
      FROM mk JOIN ns USING (hh))
    SELECT n_merged, shared, union_est,
           CAST((shared * 1000) // n_merged AS BIGINT) AS jaccard_milli,
           CAST((shared * union_est) // n_merged AS BIGINT) AS inter_est
    FROM agg
    """,
    doc="KMV set-operation estimates (r12 — Beyer et al. 2007): "
    "cross-snapshot overlap (|A∪B|, |A∩B|, Jaccard) from two mergeable "
    "k=64 sketches WITHOUT joining the corpora — the recrawl diff "
    "question ('how much of crawl B is already in A?') answered from "
    "2k integer state rows.  Sides: doc_id%4<3 vs doc_id%4>0 (true "
    "Jaccard 1/2).  The Lehmer hashes, merge-and-retruncate, shared "
    "fraction and floor-divided estimates are all portable integer "
    "arithmetic, so the oracle replays the estimator bit-for-bit.  "
    "Plan: ONE distinct partial-agg shuffle over the corpus; "
    "everything after touches <= 2k rows; "
    "operators/sketches.py kmv_overlap",
)
def sketch_kmv_overlap(spark, sf):
    from esgopeta_spark.operators.sketches import kmv_overlap

    d = T(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id")
    keys = d.where(did % 4 < 3).select(
        F.lit("a").alias("side"), did.alias("key")
    ).unionByName(
        d.where(did % 4 > 0).select(F.lit("b").alias("side"), did.alias("key"))
    )
    return kmv_overlap(keys, "key", "side", k=64)


@register(
    "scan_jsonl_quarantine",
    "E1,E8",
    """
    WITH c AS (
      SELECT doc_id, coalesce(lang, 'xx') AS lg, coalesce(n_chars, 0) AS nc
      FROM documents)
    SELECT doc_id,
      CASE WHEN doc_id % 9 IN (0, 4) THEN NULL ELSE doc_id END AS j_id,
      CASE WHEN doc_id % 9 IN (0, 4) THEN NULL ELSE lg END AS j_lang,
      CASE WHEN doc_id % 9 IN (0, 4) THEN NULL ELSE nc END AS j_n,
      CAST(CASE WHEN doc_id % 9 IN (0, 4) THEN 1 ELSE 0 END AS INTEGER)
        AS is_corrupt
    FROM c
    """,
    doc="semi-structured JSONL ingest with per-row corrupt-record "
    "quarantine (r12, E1 depth — the log/event ingest shape): one "
    "codegen projection builds a JSONL line per doc (id%9==0 truncated "
    "mid-object, id%9==4 not JSON at all, id%9==7 carries an UNKNOWN "
    "extra field the schema must tolerate, rest well-formed), then "
    "Spark's native from_json parses under PERMISSIVE mode with "
    "columnNameOfCorruptRecord — malformed rows surface as VISIBLE "
    "is_corrupt=1 rows with null fields (never a dropped row, never a "
    "failed stage), well-formed rows land typed.  JVM-side end to end "
    "(no Python in the parse path); oracle recomputes the expected "
    "verdicts in closed form.  Plan: one scan, one projection, no "
    "shuffle",
)
def scan_jsonl_quarantine(spark, sf):
    did = F.col("doc_id")
    lg = F.coalesce(F.col("lang"), F.lit("xx"))
    nc = F.coalesce(F.col("n_chars"), F.lit(0)).cast("bigint")
    line = (
        F.when(did % 9 == 0,
               F.concat(F.lit('{"id": '), did.cast("string"), F.lit(', "lang":')))
        .when(did % 9 == 4, F.concat(F.lit("garbage line "), did.cast("string")))
        .when(did % 9 == 7,
              F.concat(F.lit('{"id": '), did.cast("string"),
                       F.lit(', "extra": [1, {"deep": true}], "lang": "'),
                       lg, F.lit('", "n": '), nc.cast("string"), F.lit("}")))
        .otherwise(
            F.concat(F.lit('{"id": '), did.cast("string"),
                     F.lit(', "lang": "'), lg,
                     F.lit('", "n": '), nc.cast("string"), F.lit("}")))
    )
    d = T(spark, sf, "documents").select("doc_id", line.alias("_line"))
    parsed = F.from_json(
        F.col("_line"),
        "id BIGINT, lang STRING, n BIGINT, _bad STRING",
        {"columnNameOfCorruptRecord": "_bad", "mode": "PERMISSIVE"},
    )
    return d.select("doc_id", parsed.alias("_j")).select(
        "doc_id",
        F.col("_j.id").alias("j_id"),
        F.col("_j.lang").alias("j_lang"),
        F.col("_j.n").alias("j_n"),
        F.col("_j._bad").isNotNull().cast("int").alias("is_corrupt"),
    )


@register(
    "corpus_datasheet",
    "E4,G4",
    r"""
    WITH d AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 7 = 0 THEN 'dup family ' || (doc_id % 13)
                  WHEN doc_id % 11 = 5 THEN ''
                  ELSE coalesce(text, '') || ' u' || doc_id END AS t
      FROM documents
    ), b AS (
      SELECT doc_id, lang, source, t,
             CASE WHEN length(trim(t)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(t), '\s+')) END AS n,
             regexp_replace(lower(trim(t)), '\s+', ' ', 'g') AS k
      FROM d
    ), dup AS (
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_dup_docs
      FROM (SELECT COUNT(*) AS c FROM b GROUP BY k HAVING COUNT(*) >= 2)
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN length(trim(t)) = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_empty,
             CAST(SUM(n) AS BIGINT) AS total_tokens,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(SUM(CASE WHEN n < 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short,
             CAST(SUM(CASE WHEN n > 200 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_long
      FROM b)
    SELECT n_docs, n_empty, total_tokens,
           CAST((total_tokens * 1000) // n_docs AS BIGINT)
             AS mean_tokens_milli,
           n_langs, n_sources, n_dup_docs,
           CAST((n_dup_docs * 1000) // n_docs AS BIGINT) AS dup_milli,
           n_short, n_long
    FROM s, dup
    """,
    doc="one-row release DATASHEET (r12 — Gebru et al. 2018 shape): "
    "size, empty mass, exact token mass, language/source breadth, "
    "exact-dup mass on the exact_dedup normalization key, and the "
    "length-tail shape — the numbers a consumer reads before spending "
    "a training token.  Fixture plants dup families (id%7==0 share 13 "
    "texts) and empty docs (id%11==5) over the corpus text so every "
    "counter is exercised; all integers exact.  Plan: one partial-agg "
    "pass + ONE normalized-key hash groupBy (the exact_dedup shuffle) "
    "joined back as a 1-row broadcast; "
    "operators/quality.py corpus_datasheet",
)
def corpus_datasheet(spark, sf):
    from esgopeta_spark.operators.quality import corpus_datasheet as ds

    did = F.col("doc_id")
    t = (
        F.when(did % 7 == 0,
               F.concat(F.lit("dup family "), (did % 13).cast("string")))
        .when(did % 11 == 5, F.lit(""))
        .otherwise(F.concat(F.coalesce(F.col("text"), F.lit("")),
                            F.lit(" u"), did.cast("string")))
    )
    d = T(spark, sf, "documents").select(
        "doc_id", "lang", "source", t.alias("text")
    )
    return ds(d)


def _psi_oracle():
    from esgopeta_spark.operators.selection import milli_log2_sql

    return (
        r"""
    WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
    pb AS (SELECT least(length(t) // 200, 9) AS bucket
           FROM d WHERE doc_id % 3 = 0),
    cb AS (SELECT least(length(CASE WHEN doc_id % 4 = 0 THEN t || t
                                    ELSE t END) // 200, 9) AS bucket
           FROM d WHERE doc_id % 3 <> 0),
    spine AS (SELECT bucket FROM range(10) t(bucket)),
    pc AS (SELECT s.bucket, COUNT(p.bucket) AS c
           FROM spine s LEFT JOIN pb p ON p.bucket = s.bucket
           GROUP BY s.bucket),
    cc AS (SELECT s.bucket, COUNT(q.bucket) AS c
           FROM spine s LEFT JOIN cb q ON q.bucket = s.bucket
           GROUP BY s.bucket),
    pp AS (SELECT bucket,
                  greatest((c * 1000000) // (SELECT SUM(c) FROM pc), 1)
                    AS ppm FROM pc),
    cp AS (SELECT bucket,
                  greatest((c * 1000000) // (SELECT SUM(c) FROM cc), 1)
                    AS ppm FROM cc),
    vals AS (
      SELECT bucket, 'p' AS side, CAST(ppm AS BIGINT) AS v FROM pp
      UNION ALL
      SELECT bucket, 'q' AS side, CAST(ppm AS BIGINT) AS v FROM cp
    )"""
        + milli_log2_sql("vals", "bucket, side, v", "v", "mlt", "ml")
        + r"""
    , piv AS (
      SELECT bucket,
             MAX(CASE WHEN side = 'p' THEN v END) AS p_ppm,
             MAX(CASE WHEN side = 'q' THEN v END) AS q_ppm,
             MAX(CASE WHEN side = 'p' THEN ml END) AS mlp,
             MAX(CASE WHEN side = 'q' THEN ml END) AS mlq
      FROM mlt GROUP BY bucket)
    SELECT bucket, p_ppm, q_ppm,
           CAST((p_ppm - q_ppm) * (mlp - mlq) AS BIGINT) AS contrib_nanobits,
           CAST(SUM((p_ppm - q_ppm) * (mlp - mlq)) OVER () AS BIGINT)
             AS psi_nanobits
    FROM piv
    """
    )


@register(
    "corpus_drift_psi",
    "E4,G4",
    _psi_oracle(),
    doc="snapshot drift alarm, population stability index (r13 — the "
    "nightly-loop monitoring step beside incremental dedup: a silent "
    "scraper change shifts the length DISTRIBUTION long before per-doc "
    "quality flags fire; PSI over fixed buckets is the standard drift "
    "metric).  Engine-exact integers end to end: length-div-200 "
    "buckets capped at 10, per-side ppm shares with greatest(.,1) "
    "smoothing (empty buckets stay log-defined), per-bucket "
    "contribution (p_ppm - q_ppm) * (milli_log2(p) - milli_log2(q)) "
    "in nano-BIT units (base-2, never libm ln — the Q20 shift-and-"
    "square recurrence both engines replay bit-for-bit), total via a "
    "window sum.  Fixture: prior = id%3==0 raw; current = the rest "
    "with id%4==0 docs doubled — a planted length shift the alarm "
    "must price.  Plan: one partial-agg pass per side on the bucket "
    "key, broadcast 10-row spine, pure codegen; "
    "operators/quality.py snapshot_drift_psi",
)
def corpus_drift_psi(spark, sf):
    from esgopeta_spark.operators.quality import snapshot_drift_psi

    d = T(spark, sf, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("t")
    )
    prior = d.filter(F.col("doc_id") % 3 == 0).select(F.col("t").alias("text"))
    current = d.filter(F.col("doc_id") % 3 != 0).select(
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("t"), F.col("t")))
        .otherwise(F.col("t")).alias("text")
    )
    return snapshot_drift_psi(prior, current)


@register(
    "pipeline_pack_sequences",
    "G4,E5",
    r"""
    WITH RECURSIVE d AS (
      SELECT doc_id, doc_id % 8 AS shard,
             CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(coalesce(text, '')),
                                                 '\s+')) END AS n
      FROM documents
    ), ord AS (
      SELECT doc_id, shard, n,
             CASE WHEN n > 80 THEN 80 ELSE n END AS neff,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM d
    ), walk AS (
      SELECT doc_id, shard, n, neff, rn,
             CAST(0 AS BIGINT) AS bin_idx,
             CAST(neff AS BIGINT) AS run
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.doc_id, o.shard, o.n, o.neff, o.rn,
             CASE WHEN w.run + o.neff > 80 THEN w.bin_idx + 1
                  ELSE w.bin_idx END,
             CASE WHEN w.run + o.neff > 80 THEN CAST(o.neff AS BIGINT)
                  ELSE w.run + o.neff END
      FROM walk w JOIN ord o ON o.shard = w.shard AND o.rn = w.rn + 1
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(n AS BIGINT) AS n_tokens,
           bin_idx,
           CAST(run - neff AS BIGINT) AS bin_offset,
           CAST(CASE WHEN n > 80 THEN 1 ELSE 0 END AS INTEGER) AS truncated
    FROM walk
    """,
    doc="SEQUENCE PACKING (r14 — the pretraining batcher's step between "
    "selection and tokenized shards): documents greedily pack into "
    "80-token training bins in deterministic id order within 8 shards; "
    "a document over the budget truncates to it, takes its own bin, "
    "and flags VISIBLY (never silently dropped or split).  The "
    "capacity-reset recursion has no closed window form, so the Spark "
    "side runs the ewma_smooth idiom — repartition-by-shard + "
    "in-partition sort + ONE Arrow mapInPandas pass with cross-batch "
    "carry — and the oracle runs the identical recurrence as a DuckDB "
    "RECURSIVE CTE.  All-integer state; corpus token spread (10..99, "
    "median 56) exercises fit/reset/truncate branches.  Scale shape: "
    "bins never cross shards, so 1000 executors pack 1000 shards with "
    "zero coordination — one shuffle, one Arrow pass; "
    "operators/selection.py pack_sequences",
)
def pipeline_pack_sequences(spark, sf):
    from esgopeta_spark.operators.selection import pack_sequences
    from esgopeta_spark.operators.text import words

    t = F.coalesce(F.col("text"), F.lit(""))
    toks = F.when(
        F.length(F.trim(t)) == 0, F.lit(0)
    ).otherwise(F.size(words(t))).cast("bigint")
    d = T(spark, sf, "documents").select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        toks.alias("n_tokens"),
    )
    return pack_sequences(d, max_tokens=80)
