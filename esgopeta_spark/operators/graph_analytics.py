"""GraphX-style analytics over edge lists (SURVEY.md §7 design stance:
GraphFrames-style joins from PySpark, not the Scala GraphX API; mandate
`BASELINE.json` north_star "analytical graph queries fit GraphX").

The edge list is the `value_type = 'relation'` slice of the quads model
(SURVEY.md §1.3): src = soul, dst = value_relation.  These operators
take any (src, dst) DataFrame, so they run equally on GunGraph relation
slices and on ad-hoc edge projections of the relational tables.

Determinism note (drives the DuckDB oracles): PageRank is computed in
**integer micro-units with floor division** — floating-point rank sums
are partition-order dependent and would break cross-engine value-hash
comparison; 64-bit integer sums are exact and order-free.  The rank of
a node after i iterations is identical, bit for bit, in any engine that
implements the same integer recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank (damping 0.85) over a directed edge list.

    Returns (node, rank_micro): rank in integer millionths, start mass
    1_000_000 per node.  Recurrence per iteration, all in BIGINT:

        contrib(u)  = rank(u) DIV out_degree(u)          -- per edge
        rank'(v)    = 150000 + (85 * sum contrib) DIV 100

    Dangling-node mass (nodes with no out-edges) is dropped, not
    redistributed — the simplified formulation; the oracle mirrors it.

    Plan shape: out-degree is computed once and joined by src each
    round; each round is edges ⋈ rank (shuffle on src) then a
    sum-shuffle on dst — partial aggregation combines map-side.  The
    iteration count is a small constant so the growing logical plan is
    harmless (no checkpoint needed; cf. dup_components for the
    unbounded-iteration treatment).  At scale, pre-partition edges by
    src and ranks by node to make the per-round join co-located.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    ed = e.join(deg, "src")  # (src, dst, _deg)
    rank = nodes.withColumn("rank_micro", F.lit(1000000).cast("bigint"))
    for _ in range(iterations):
        contrib = (
            ed.join(rank, ed.src == rank.node)
            .select("dst", F.expr("rank_micro DIV _deg").alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_in"))
        )
        rank = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (F.lit(150000).cast("bigint") + F.expr("(85 * coalesce(_in, 0)) DIV 100")).alias(
                "rank_micro"
            ),
        )
    return rank


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph given as any
    edge list (direction and duplicates ignored; self-loops dropped).

    Canonicalize to a < b once, then enumerate each triangle exactly
    once as a < b < c via two equi-joins (e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c))
    — the standard "oriented wedge" formulation: no triangle is counted
    6 ways, and each join is an equi-join Catalyst can shuffle or
    broadcast as sizes dictate.  Per-node counts come from exploding
    each found triangle into its three corners.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])  # x < y < z by construction
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))
