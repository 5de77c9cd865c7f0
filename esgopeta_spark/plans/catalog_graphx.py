"""GraphX-style analytics catalog entries: PageRank and triangle
counting over edge projections of the testdata (SURVEY.md §7 stance —
vertex/edge DataFrames + iterated joins; mandate "analytical graph
queries fit GraphX").  Same determinism rules as catalog.py; PageRank
uses all-integer micro-unit arithmetic (see operators/graph_analytics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from esgopeta_spark.plans.catalog import T, register

_PR_EDGES_SQL = """
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""

_PR_ITER_SQL = """
    i{i} AS (
      SELECT ed.dst, SUM(r{p}.r // ed.d) AS s
      FROM ed JOIN r{p} ON ed.src = r{p}.node GROUP BY ed.dst),
    r{i} AS (
      SELECT n.node, CAST(150000 + (85 * COALESCE(i{i}.s, 0)) // 100 AS BIGINT) AS r
      FROM nodes n LEFT JOIN i{i} ON n.node = i{i}.dst)
"""


@register(
    "graph_pagerank_transactions",
    "A1,E3,E4",
    "WITH edges AS ("
    + _PR_EDGES_SQL
    + """),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, d.d FROM edges e JOIN deg d ON e.src = d.src),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
    """
    + ",".join(_PR_ITER_SQL.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
    SELECT node, r AS rank_micro FROM r3
    """,
    doc="3-iteration PageRank (damping 0.85) over the customer->supplier transaction "
    "graph, in integer micro-units with floor division so rank sums are exact and "
    "order-free on both engines (operators/graph_analytics.pagerank; the graph is the "
    "GunGraph relation-slice shape, SURVEY.md §1.3)",
)
def graph_pagerank_transactions(spark, sf):
    from esgopeta_spark.operators.graph_analytics import pagerank

    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # distinct on the (int, int) key pair FIRST — 8-byte shuffle rows —
    # and keep INT64 surrogate node ids (even = customer, odd = supplier)
    # through every iteration exchange: the string namespace tags only
    # the final output (r14 optimization, guide §2.3 narrower types —
    # string node keys inflated the 3 iterations' rank/contrib shuffles
    # and the degree join for no semantic gain; rank values are
    # structural, so the bijective id mapping leaves them bit-identical
    # — verified row-exact vs the string formulation at sf0.01/sf0.1).
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("src"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("dst"),
        )
    )
    r = pagerank(edges, iterations=3)
    return r.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), F.expr("node div 2").cast("string")),
        )
        .otherwise(F.concat(F.lit("s"), F.expr("node div 2").cast("string")))
        .alias("node"),
        "rank_micro",
    )


@register(
    "graph_triangles_coorder",
    "A1,E3,E4",
    """
    WITH e AS (
      SELECT LEAST(a.l_partkey, b.l_partkey) AS a, GREATEST(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
    SELECT node, COUNT(*) AS triangles FROM corners GROUP BY node
    """,
    doc="per-part triangle counts on the recurring-co-purchase graph (parts co-ordered "
    "in >= 2 distinct orders: the pair-count aggregate shuffles once with map-side "
    "combine, and the multiplicity filter keeps the edge set sparse at every SF); "
    "degree-ordered wedge enumeration in operators/graph_analytics.triangle_counts "
    "(the id-ordered DuckDB oracle enumerates the same triangle set)",
)
def graph_triangles_coorder(spark, sf):
    from esgopeta_spark.operators.graph_analytics import triangle_counts

    return triangle_counts(_coorder_edges(spark, sf), src="ea", dst="eb")


def _coorder_edges(spark, sf):
    """Recurring co-purchase edges: unordered part pairs co-ordered in
    >= 2 distinct orders (shared by graph_triangles_coorder and
    graph_communities_lpa; the DuckDB oracles keep the equivalent
    distinct + self-join formulation).

    r14 optimization (guide §2.4 remove shuffles): the old shape was
    distinct (order, part) -> self-join on the order key -> pair agg —
    two shuffles plus a join before the pair aggregate.  One
    groupBy(order).collect_set both DEDUPS and GROUPS in a single
    exchange, and the per-order pair stream is then two chained
    Generates (no join, no extra exchange) feeding the same pair
    aggregate: 3 exchanges + SMJ -> 2 exchanges.  Per-order part sets
    are tiny and bounded (TPC-H <= 7), so the exploded pair stream is
    the same size the join produced; sort_array makes the set
    deterministic.  Output proven row-equal to the old derivation at
    sf0.01/sf0.1."""
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = sets.select(F.explode("ps").alias("ea"), "ps").select(
        "ea", F.explode(F.filter("ps", lambda y: y > F.col("ea"))).alias("eb")
    )
    return (
        pairs.groupBy("ea", "eb")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("ea", "eb")
    )


@register(
    "graph_bfs_hops_nation0",
    "A1,E3",
    """
    WITH RECURSIVE
    pairs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    eu AS (
      SELECT 'c' || CAST(ck AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst FROM pairs
      UNION ALL
      SELECT 's' || CAST(sk AS VARCHAR), 'c' || CAST(ck AS VARCHAR) FROM pairs),
    seed AS (
      SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node
      FROM customer WHERE c_nationkey = 0),
    walk(node, hops) AS (
      SELECT node, CAST(0 AS BIGINT) FROM seed
      UNION
      SELECT e.dst, w.hops + 1 FROM walk w JOIN eu e ON w.node = e.src
      WHERE w.hops < 4)
    SELECT node, MIN(hops) AS hops FROM walk GROUP BY node
    """,
    doc="multi-source BFS hop distance (GraphX ShortestPaths shape) from nation-0 "
    "customers over the undirected customer<->supplier transaction graph, bounded at "
    "4 hops: hop 1 = suppliers they buy from, hop 2 = co-buying customers, ...  "
    "All-integer distances are engine-exact; the oracle is a recursive CTE whose "
    "UNION-dedup keeps the state space at (node, hops) pairs, never path counts "
    "(operators/graph_analytics.shortest_hops: frontier-only joins + anti-join "
    "visited set, localCheckpoint per round)",
)
def graph_bfs_hops_nation0(spark, sf):
    from esgopeta_spark.operators.graph_analytics import shortest_hops

    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        T(spark, sf, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"))
    )
    return shortest_hops(edges, seeds, max_hops=4)


@register(
    "graph_communities_lpa",
    "A1,E3,E4,E5",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    l0 AS (SELECT DISTINCT a AS node, a AS label FROM e),
    g1 AS (SELECT e.a AS node, l0.label, COUNT(*) AS c
           FROM e JOIN l0 ON e.b = l0.node GROUP BY 1, 2),
    l1 AS (SELECT node, label FROM (
             SELECT node, label,
                    ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
             FROM g1) WHERE rn = 1),
    g2 AS (SELECT e.a AS node, l1.label, COUNT(*) AS c
           FROM e JOIN l1 ON e.b = l1.node GROUP BY 1, 2),
    l2 AS (SELECT node, label FROM (
             SELECT node, label,
                    ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
             FROM g2) WHERE rn = 1),
    g3 AS (SELECT e.a AS node, l2.label, COUNT(*) AS c
           FROM e JOIN l2 ON e.b = l2.node GROUP BY 1, 2),
    l3 AS (SELECT node, label FROM (
             SELECT node, label,
                    ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
             FROM g3) WHERE rn = 1)
    SELECT node, label AS community FROM l3
    """,
    doc="synchronous label-propagation community detection (Raghavan et al. "
    "2007, GraphX LabelPropagation analog) on the recurring co-purchase graph "
    "(same edge derivation as graph_triangles_coorder), 3 deterministic rounds: "
    "next label = neighbors' most frequent, ties to the SMALLEST label — a "
    "total order, so the oracle is the identical recurrence unrolled as one "
    "CTE block per round.  Per round: one edge⋈label equi-join + one "
    "(node,label) partial agg + one per-node argmax window "
    "(operators/graph_analytics.label_propagation)",
)
def graph_communities_lpa(spark, sf):
    from esgopeta_spark.operators.graph_analytics import label_propagation

    # shared r14-optimized derivation (see _coorder_edges: one
    # collect_set exchange + chained Generates replace the distinct +
    # order-key self-join)
    return label_propagation(_coorder_edges(spark, sf), rounds=3, src="ea", dst="eb")


# k-core oracle: the peel recurrence unrolled one CTE block per round (same
# pattern as the LPA oracle above; extra rounds past the fixpoint are no-ops,
# so both engines running the full unroll agree even when the data converges
# early — the Spark side's early break only skips no-op rounds).
_KCORE_ROUNDS = 8
_KCORE_K = 2


def _kcore_oracle(rounds: int, k: int) -> str:
    blocks = [
        """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p0 AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    e0 AS MATERIALIZED (SELECT a, b FROM p0 UNION SELECT b, a FROM p0)"""
    ]
    for r in range(rounds):
        blocks.append(
            f""",
    s{r} AS MATERIALIZED (SELECT a FROM e{r} GROUP BY a HAVING COUNT(*) >= {k}),
    e{r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e
                 JOIN s{r} USING (a) JOIN s{r} t ON e.b = t.a)"""
        )
    blocks.append(
        f"""
    SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM e{rounds} GROUP BY a HAVING COUNT(*) >= {k}"""
    )
    return "".join(blocks)


@register(
    "graph_kcore_members",
    "A1,E3,E4",
    _kcore_oracle(_KCORE_ROUNDS, _KCORE_K),
    doc=f"k-core decomposition (Seidman 1983) of the recurring co-purchase "
    "graph (same edge derivation as graph_triangles_coorder/LPA): "
    f"iteratively peel nodes with degree < {_KCORE_K} until fixpoint "
    f"(unroll bound {_KCORE_ROUNDS} rounds — covers the measured fixpoint "
    "at every shipped SF with margin; post-fixpoint rounds are no-ops so "
    "the fixed unroll is engine-exact; each round CTE is MATERIALIZED — plain CTEs inline 3^rounds copies of the base scan), report each survivor's in-core "
    "degree.  Per round: one degree partial agg + two survivor semi-joins, "
    "all narrow integers (operators/graph_analytics.kcore_members; "
    "fixpoint-reached pinned in pytest)",
)
def graph_kcore_members(spark, sf):
    from esgopeta_spark.operators.graph_analytics import kcore_members

    li = T(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("ea"), F.col("pb").alias("eb"))
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("ea", "eb")
    )
    return kcore_members(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS, src="ea", dst="eb")


# Bellman-Ford oracle: the relax recurrence unrolled one MATERIALIZED CTE
# block per round (same pattern as the k-core oracle above; post-fixpoint
# rounds are no-ops, so the fixed unroll agrees with the Spark side's
# early break).
def _bf_oracle(rounds: int) -> str:
    blocks = [
        """
    WITH pairs AS (
      SELECT o_custkey AS ck, l_suppkey AS sk,
             CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    eu AS MATERIALIZED (
      SELECT 'c' || CAST(ck AS VARCHAR) AS src, 's' || CAST(sk AS VARCHAR) AS dst, w FROM pairs
      UNION ALL
      SELECT 's' || CAST(sk AS VARCHAR), 'c' || CAST(ck AS VARCHAR), w FROM pairs),
    d0 AS MATERIALIZED (
      SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS cost
      FROM customer WHERE c_nationkey = 0)"""
    ]
    for r in range(rounds):
        blocks.append(
            f""",
    d{r + 1} AS MATERIALIZED (
      SELECT node, MIN(cost) AS cost FROM (
        SELECT node, cost FROM d{r}
        UNION ALL
        SELECT e.dst, d.cost + e.w FROM d{r} d JOIN eu e ON d.node = e.src)
      GROUP BY node)"""
        )
    blocks.append(f"""
    SELECT node, cost AS cost_cents FROM d{rounds}""")
    return "".join(blocks)


@register(
    "graph_cheapest_path_nation0",
    "A1,E3,E4",
    _bf_oracle(4),
    doc="hop-bounded cheapest-path costs (synchronous Bellman-Ford, the "
    "Pregel SSSP classic — the WEIGHTED companion to graph_bfs_hops_nation0) "
    "from nation-0 customers over the customer<->supplier graph, edge cost "
    "= the pair's cheapest line-item price in exact cents, 4 relax rounds.  "
    "All-integer costs are engine-exact; the oracle unrolls the identical "
    "relax recurrence one MATERIALIZED CTE per round "
    "(operators/graph_analytics.cheapest_path_costs: per-round equi-join + "
    "min partial agg, lineage cut, early fixpoint break)",
)
def graph_cheapest_path_nation0(spark, sf):
    from esgopeta_spark.operators.graph_analytics import cheapest_path_costs

    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(
            (F.min(F.col("l_extendedprice").cast("decimal(12,2)")) * 100)
            .cast("bigint")
            .alias("w")
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
            "w",
        )
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w").unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"), "w")
    )
    seeds = (
        T(spark, sf, "customer")
        .filter(F.col("c_nationkey") == 0)
        .select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"))
    )
    return cheapest_path_costs(edges, seeds, max_hops=4, cost="w").select(
        "node", F.col("cost").alias("cost_cents")
    )


@register(
    "graph_hits_transactions",
    "A1,E3,E4",
    """
    WITH pairs AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT src AS node FROM pairs UNION SELECT dst FROM pairs),
    h0 AS (SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes),
    a1 AS MATERIALIZED (
      SELECT p.dst AS node, CAST(SUM(h0.hub) AS BIGINT) AS auth
      FROM pairs p JOIN h0 ON p.src = h0.node GROUP BY p.dst),
    h1 AS MATERIALIZED (
      SELECT p.src AS node, CAST(SUM(a1.auth) AS BIGINT) AS hub
      FROM pairs p JOIN a1 ON p.dst = a1.node GROUP BY p.src),
    a2 AS MATERIALIZED (
      SELECT p.dst AS node, CAST(SUM(h1.hub) AS BIGINT) AS auth
      FROM pairs p JOIN h1 ON p.src = h1.node GROUP BY p.dst),
    h2 AS MATERIALIZED (
      SELECT p.src AS node, CAST(SUM(a2.auth) AS BIGINT) AS hub
      FROM pairs p JOIN a2 ON p.dst = a2.node GROUP BY p.src)
    SELECT n.node,
           CAST(COALESCE(h2.hub, 0) AS BIGINT) AS hub_score,
           CAST(COALESCE(a2.auth, 0) AS BIGINT) AS auth_score
    FROM nodes n LEFT JOIN h2 ON n.node = h2.node
                 LEFT JOIN a2 ON n.node = a2.node
    """,
    doc="HITS hubs-and-authorities (Kleinberg 1999), 2 UNNORMALIZED integer "
    "rounds over the directed customer->supplier purchase graph: "
    "authorities = well-bought suppliers, hubs = broad-basket customers.  "
    "Dropping the per-round L2 rescale keeps every score exact int64 "
    "(ranking-invariant at fixed rounds) so the oracle unrolls the same "
    "recursion (operators/graph_analytics.hits_scores: two equi-join + "
    "partial-sum stages per round, lineage cut)",
)
def graph_hits_transactions(spark, sf):
    from esgopeta_spark.operators.graph_analytics import hits_scores

    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    return hits_scores(edges, rounds=2)


_PPR_ITER_SQL = """
    pi{i} AS (
      SELECT ed.dst, SUM(pr{p}.r // ed.d) AS s
      FROM ed JOIN pr{p} ON ed.src = pr{p}.node GROUP BY ed.dst),
    pr{i} AS (
      SELECT f.node,
             CAST(CASE WHEN f.is_seed = 1 THEN (150000 * t.nv) // t.ns ELSE 0 END
                  + (85 * COALESCE(pi{i}.s, 0)) // 100 AS BIGINT) AS r
      FROM flagged f CROSS JOIN tot t LEFT JOIN pi{i} ON f.node = pi{i}.dst)
"""


@register(
    "graph_ppr_seeded",
    "A1,E3,E4",
    "WITH edges AS ("
    + _PR_EDGES_SQL
    + """),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, d.d FROM edges e JOIN deg d ON e.src = d.src),
    flagged AS (
      SELECT node,
             CASE WHEN node LIKE 'c%'
                       AND CAST(substr(node, 2) AS BIGINT) % 7 = 0
                  THEN 1 ELSE 0 END AS is_seed
      FROM nodes),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                   CAST(SUM(is_seed) AS BIGINT) AS ns FROM flagged),
    pr0 AS (
      SELECT f.node,
             CAST(CASE WHEN f.is_seed = 1 THEN (1000000 * t.nv) // t.ns
                       ELSE 0 END AS BIGINT) AS r
      FROM flagged f CROSS JOIN tot t),
    """
    + ",".join(_PPR_ITER_SQL.format(i=i, p=i - 1) for i in (1, 2, 3))
    + """
    SELECT node, r AS rank_micro FROM pr3
    """,
    doc="3-iteration PERSONALIZED PageRank over the customer->supplier "
    "transaction graph: teleport mass lands only on the seed customers "
    "(custkey % 7 = 0), so ranks measure proximity to the seed cohort — "
    "the 'expand from these known-good nodes' query.  Integer micro "
    "units, |V|/|S| via a broadcast 1-row aggregate, floor division "
    "everywhere (operators/graph_analytics.personalized_pagerank)",
)
def graph_ppr_seeded(spark, sf):
    from esgopeta_spark.operators.graph_analytics import personalized_pagerank

    o = T(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    seeds = (
        T(spark, sf, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node"))
    )
    return personalized_pagerank(edges, seeds, iterations=3)
