"""Similarity search over embedding columns (SURVEY.md §2 G3).

Two tiers:

- **brute-force top-k cosine** — exact baseline.  The query side is
  broadcast (queries are small); the corpus never shuffles; top-k per
  query via window row_number.  Dot products run as codegen'd
  ``aggregate(zip_with(...))`` over double arrays — deterministic
  left-to-right fold, reproducible against DuckDB's list_dot_product.
- **LSH-bucketed ANN (random hyperplanes)** — the 100 TB path: sign-hash
  each vector into a bucket; only join query/corpus rows in the same
  bucket.  Probing multiple tables restores recall.  Same join-shape
  trick as MinHash-LSH: equi-join on bucket id, never a cross join.

- **IVF-flat ANN** (``topk_cosine_ivf``) — coarse-quantize into cells via
  a deterministic strided codebook, probe the n nearest cells per query;
  the same equi-join shape with a tunable recall/cost dial.
- **embedding near-dup** (``embedding_dup_pairs_*``) — all-pairs cosine >=
  threshold, exact (quadratic oracle) and LSH-bucketed (linear scale path).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left fold — bitwise-reproducible across engines."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Fixed-dim dot as an unrolled sum of element_at products.

    Higher-order functions (``aggregate``/``zip_with``) are interpreted
    per element in Catalyst — the fold never enters whole-stage codegen.
    Unrolling to a flat arithmetic chain keeps the identical left-to-right
    IEEE summation order (bitwise-equal to the fold and to DuckDB's
    list_dot_product) while compiling into one codegen'd expression:
    measured 1.7x faster on the brute-force top-k scan.
    """
    acc = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        acc = acc + F.element_at(a, i) * F.element_at(b, i)
    return acc


def sq_norm_unrolled(a: Column, dim: int) -> Column:
    acc = F.element_at(a, 1) * F.element_at(a, 1)
    for i in range(2, dim + 1):
        acc = acc + F.element_at(a, i) * F.element_at(a, i)
    return acc


def cosine_unrolled(a: Column, b: Column, dim: int) -> Column:
    return dot_unrolled(a, b, dim) / (F.sqrt(sq_norm_unrolled(a, dim)) * F.sqrt(sq_norm_unrolled(b, dim)))


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) ⋈ corpus (no shuffle of the corpus),
    then one shuffle on query_id for the per-query top-k window.  Ties
    broken by neighbor id for determinism.  Pass ``dim`` when the vector
    width is known to use the codegen'd unrolled kernel (same float
    semantics, ~1.7x faster than the interpreted fold).
    """
    from esgopeta_spark.session import ensure_min_partitions

    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("nbr_id"), as_double(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv"))
    sim = (
        cosine_unrolled(F.col("_qv"), F.col("_cv"), dim)
        if dim is not None
        else cosine(F.col("_qv"), F.col("_cv"))
    )
    scored = c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id")).withColumn("cosine_sim", sim)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine_sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-hash bucket id: bit i = sign(vec · plane_i).

    Deliberately the compact HOF fold, not an unrolled chain: with
    n_tables × n_planes plane-dots in one projection, unrolling inflates
    the serialized plan to multi-MB task binaries (measured 8.8 MiB) and
    janino compile time dominates.  The fold keeps the tree small; bucket
    hashing is a tiny fraction of runtime either way.
    """
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, arr) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit * F.lit(2**i).cast("long")
    return bucket


def topk_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent hyperplane
    hashes; candidates = bucket-equi-join; exact cosine re-rank on the
    (small) candidate set.  Corpus-side work is a projection + equi-join —
    scales linearly, survives 100×.  (No forced repartition here: bucket
    hashing is cheap per row, and widening a tiny scan costs more in
    shuffle+task overhead than it buys — measured 2x slower at sf0.1.)"""
    c = corpus.select(F.col(id_col).alias("nbr_id"), as_double(F.col(vec_col)).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv"))
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        ct = c.withColumn("_b", lsh_bucket(F.col("_cv"), planes)).withColumn("_t", F.lit(t))
        qt = q.withColumn("_b", lsh_bucket(F.col("_qv"), planes)).withColumn("_t", F.lit(t))
        pair = ct.join(F.broadcast(qt), ["_t", "_b"]).filter(F.col("nbr_id") != F.col("query_id"))
        cand = pair if cand is None else cand.unionByName(pair)
    cand = cand.select("query_id", "nbr_id", "_qv", "_cv").distinct()
    scored = cand.withColumn("cosine_sim", cosine_unrolled(F.col("_qv"), F.col("_cv"), dim))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine_sim", "rank")
    )


def pairwise_cosine_sample(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", modulus: int = 50) -> DataFrame:
    """All-pairs cosine restricted to a deterministic id-sampled subset —
    the bounded variant of the quadratic primitive for stats/QA jobs."""
    s = df.filter(F.col(id_col) % modulus == 0).select(
        F.col(id_col).alias("_sid"), as_double(F.col(vec_col)).alias("_sv")
    )
    a = s.select(F.col("_sid").alias("id_a"), F.col("_sv").alias("_va"))
    b = s.select(F.col("_sid").alias("id_b"), F.col("_sv").alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine(F.col("_va"), F.col("_vb")))
        .select("id_a", "id_b", "cosine_sim")
    )


def topk_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    centroid_stride: int = 25,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into cells,
    probe only the ``n_probe`` nearest cells per query.

    The coarse codebook is a deterministic id-strided sample of the corpus
    itself (every ``centroid_stride``-th vector) — no training pass, fully
    reproducible.  Cell assignment is an argmax over the broadcast
    codebook (corpus never shuffles for it); the probe join is equi on
    cell id, so query work scales with corpus/|cells| * n_probe, never the
    full corpus.  At 100 TB the codebook would come from a k-means job and
    the assignment plan is unchanged.
    """
    from esgopeta_spark.session import ensure_min_partitions

    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("nbr_id"), as_double(F.col(vec_col)).alias("_cv")
    )
    cents = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("_cell"), as_double(F.col(vec_col)).alias("_cent")
    )
    w_assign = Window.partitionBy("nbr_id").orderBy(F.col("_sim").desc(), F.col("_cell").asc())
    assigned = (
        c.join(F.broadcast(cents))
        .withColumn("_sim", cosine_unrolled(F.col("_cv"), F.col("_cent"), dim))
        .withColumn("_rk", F.row_number().over(w_assign))
        .filter(F.col("_rk") == 1)
        .select("nbr_id", "_cv", "_cell")
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("_cell").asc())
    probes = (
        q.join(F.broadcast(cents))
        .withColumn("_sim", cosine_unrolled(F.col("_qv"), F.col("_cent"), dim))
        .withColumn("_rk", F.row_number().over(w_probe))
        .filter(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", "_cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "_cell")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine_unrolled(F.col("_qv"), F.col("_cv"), dim))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("nbr_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine_sim", "rank")
    )


def embedding_dup_pairs_exact(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: all (a<b) with cosine >=
    threshold.  Quadratic — the correctness oracle for the LSH variant and
    usable directly on bounded partitions (e.g. per-shard QA)."""
    from esgopeta_spark.session import ensure_min_partitions

    v = ensure_min_partitions(df).select(F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v"))
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine_unrolled(F.col("_va"), F.col("_vb"), dim))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def embedding_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup at scale: hyperplane-LSH buckets ->
    within-bucket self-join -> exact cosine verify.  High-cosine pairs
    land in the same bucket with probability (1 - theta/pi)^n_planes per
    table; multiple tables drive recall up while the join stays equi.

    Tune planes to the threshold's angle: recall per table is
    (1 - arccos(threshold)/pi)^n_planes.  The defaults target true
    near-dups (threshold >= 0.9, ~18deg -> 0.35/table, 6 tables -> 92%).
    For looser thresholds (0.3-0.5, theta ~60-70deg) use 3-4 planes and
    more tables, accepting a larger candidate set — below ~0.3 the angle
    no longer separates from random and exact verification dominates
    regardless.  (Bucket hashing is cheap -> no forced repartition; the
    verify stage inherits parallelism from the candidate distinct's
    shuffle.)
    """
    v = df.select(F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v"))
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        bt = v.select("_id", "_v", lsh_bucket(F.col("_v"), planes).alias("_b"), F.lit(t).alias("_t"))
        a = bt.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "_b", "_t")
        b = bt.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "_b", "_t")
        pair = a.join(b, ["_t", "_b"]).filter(F.col("id_a") < F.col("id_b"))
        cand = pair if cand is None else cand.unionByName(pair)
    cand = cand.select("id_a", "id_b", "_va", "_vb").distinct()
    return (
        cand.withColumn("cosine_sim", cosine_unrolled(F.col("_va"), F.col("_vb"), dim))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
