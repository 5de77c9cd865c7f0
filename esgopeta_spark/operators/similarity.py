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

An IVF variant (k-means coarse quantizer) would slot in the same way —
assign centroid id, equi-join on centroid; we ship hyperplane-LSH since
it needs no training pass.
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


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) ⋈ corpus (no shuffle of the corpus),
    then one shuffle on query_id for the per-query top-k window.  Ties
    broken by neighbor id for determinism.
    """
    c = corpus.select(F.col(id_col).alias("nbr_id"), as_double(F.col(vec_col)).alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("_qv"))
    scored = c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id")).withColumn(
        "cosine_sim", cosine(F.col("_qv"), F.col("_cv"))
    )
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
    """Sign-hash bucket id: bit i = sign(vec · plane_i)."""
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
    scales linearly, survives 100×."""
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
    scored = cand.withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv")))
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
