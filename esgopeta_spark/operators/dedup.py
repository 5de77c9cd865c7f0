"""Deduplication operators for training-data pipelines (SURVEY.md §2 G1/G2).

Four tiers, cheapest first:

1. **exact** — hash-groupBy on a normalized key.  One shuffle; at 100 TB
   pre-partition by the hash so the groupBy is co-located.
2. **MinHash + LSH** — shingle -> minhash signature -> band buckets ->
   self-join within buckets only.  The candidate join is an equi-join on
   (band, bucket-hash): no O(n²) cross join ever materializes; skew in a
   hot bucket is handled by AQE skew-join splitting.
3. **SimHash** — 64-bit fingerprint; near-dups = small Hamming distance.
   Banded into 4×16-bit chunks for the same equi-join candidate trick.
4. **n-gram Jaccard verify** — exact verification on LSH candidates.

Everything below is built-in expressions (xxhash64, transform, explode,
aggregate) — no Python in the candidate-generation hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Canonical text form for dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct normalized text.

    ``min`` aggregate = map-side partial + single shuffle on the text
    hash.  The grouping key is sha2-256 of the normalized text (32 bytes),
    not the full text: constant shuffle width regardless of doc length,
    and — unlike a 64-bit key — no birthday-bound risk of silently merging
    distinct documents at 10⁹+ corpus sizes (64-bit collision odds pass
    1% around 6×10⁸ keys; 256-bit is safe at any realistic corpus).
    """
    h = F.sha2(normalize_text(F.col(text_col)), 256).alias("_th")
    return (
        df.withColumn("_th", h)
        .groupBy("_th")
        .agg(F.min(F.col(id_col)).alias("_keep"))
        .select(F.col("_keep").alias(id_col))
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups with >1 member: (hash, n_dups, keeper_id)."""
    return (
        df.groupBy(normalize_text(F.col(text_col)).alias("norm_text"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# shingles / n-grams
# ---------------------------------------------------------------------------


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set as array<string> (distinct).

    Only FULL-length-n windows count: a doc with fewer than n words has
    an EMPTY shingle set (no partial gram, no empty-string gram).  The
    partial grams emitted before r4 made two empty docs "share" the ''
    gram and flag as contaminated/near-dup — wrong leakage semantics
    (ADVICE r3)."""
    words = F.split(normalize_text(col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as ONE pass over the shingles.

    Naive formulation (k separate ``array_min(transform(...))`` columns)
    re-evaluates the whole shingle expression k times — measured 400s+ on
    50k docs.  Instead: hash every shingle once, then a single
    ``aggregate`` folds the base hashes into a k-wide running-min vector,
    deriving the k-th hash family as ``xxhash64(base_hash, k)`` (cheap
    long-long hash, no string re-hash, no overflow under ANSI mode).
    Cost: O(|shingles| * k) long hashes, shingles evaluated exactly once.
    """
    base = F.transform(shingle_col, lambda s: F.xxhash64(s))
    idx = F.sequence(F.lit(1), F.lit(num_hashes))
    init = F.transform(idx, lambda i: F.lit(2**63 - 1).cast("long"))
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(acc, idx, lambda cur, i: F.least(cur, F.xxhash64(h, i))),
    )


def shingle_hashes(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set as array<long> gram hashes (not strings).

    Gram identity is a rolling xxhash64 combine of the word hashes:
    ``xxhash64(xxhash64(w_i, w_i+1), w_i+2)``, built with n-1 zip_with
    passes over length-aligned slices.  ~10x cheaper than materializing
    gram *strings* (measured 0.34s vs 3.1s on 5k docs): no per-gram string
    concat/copy, and the whole thing stays one codegen'd projection.
    Docs shorter than n words produce an EMPTY gram set, matching
    ``shingles`` (full-length-n windows only).
    """
    words = F.split(normalize_text(col), " ")
    wh = F.transform(words, lambda s: F.xxhash64(s))
    m = F.greatest(F.size(wh) - (n - 1), F.lit(0))
    acc = F.slice(wh, 1, m)
    for k in range(1, n):
        acc = F.zip_with(acc, F.slice(wh, k + 1, m), lambda a, b: F.xxhash64(a, b))
    return acc


def minhash_signature_np(num_hashes: int = 64, seed: int = 2026):
    """Arrow-vectorized MinHash fold: array<long> base shingle hashes ->
    array<long> k-wide signature.

    The expensive part of MinHash is the k-family min-fold, O(|shingles|*k)
    per doc.  As a Catalyst higher-order function that fold is interpreted
    per element (~7s for 5k docs at k=64); as one numpy broadcast
    ``min((A*h+B) mod P, axis=1)`` it is a dense uint64 matrix op (<1s).
    String hashing stays JVM-side (xxhash64 in the scan projection); only
    8-byte longs cross the Arrow boundary.  Fixed seed => deterministic.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    P = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(seed)
    A = rng.integers(1, int(P), size=num_hashes, dtype=np.uint64)
    B = rng.integers(0, int(P), size=num_hashes, dtype=np.uint64)
    empty = (np.full(num_hashes, int(P) - 1, dtype=np.uint64)).astype(np.int64)

    def _minhash(base):
        # one dense pass over the whole Arrow batch: flatten every row's
        # gram hashes, compute the (k, total_grams) family matrix once,
        # then per-row min via minimum.reduceat on the row offsets.
        # (A*h+B) mod P per family; uint64 wraparound before mod is a
        # fixed deterministic mixing, fine for LSH purposes.
        arrs = [np.asarray(hs, dtype=np.int64) for hs in base]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series([empty] * len(arrs))
        flat = np.concatenate([a for a in arrs if len(a)]).view(np.uint64)
        m = (A[:, None] * flat[None, :] + B[:, None]) % P
        nonempty = lens > 0
        offsets = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
        mins = np.minimum.reduceat(m, offsets, axis=1).astype(np.int64)  # (k, n_nonempty)
        out = [empty] * len(arrs)
        for j, i in enumerate(np.flatnonzero(nonempty)):
            out[i] = mins[:, j]
        return pd.Series(out)

    return pandas_udf(_minhash, ArrayType(LongType()))


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """(_id, band, bh) banded MinHash signature rows — the stateless
    projection shared by the batch self-join (minhash_lsh_candidates)
    and the streaming bucket handler (streaming/dedup.py): shingle
    hashes and band hashes are JVM xxhash64, the k-family min-fold is
    the Arrow numpy kernel, so batch and stream produce bit-identical
    keys.  Works on batch AND streaming DataFrames (no window, no
    checkpoint here)."""
    rows = num_hashes // bands
    if vectorized:
        base = df.select(
            F.col(id_col).alias("_id"),
            shingle_hashes(F.col(text_col), shingle_n).alias("_base"),
        )
        sig = base.select("_id", minhash_signature_np(num_hashes)(F.col("_base")).alias("_sig"))
    else:
        sig = df.select(
            F.col(id_col).alias("_id"),
            minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes).alias("_sig"),
        )
    return sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # xxhash64 is variadic: hash the band's signature rows
                        # directly as longs — no per-row string materialization
                        F.xxhash64(*[F.element_at("_sig", b * rows + r + 1) for r in range(rows)]).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows=num_hashes/bands per band; two docs collide if any band's rows
    all match.  Join is equi on (band, hash-of-band): linear in collisions,
    never quadratic in corpus size.  Returns (id_a, id_b) with a < b.

    The banded-signature relation is materialized (localCheckpoint) before
    the self-join: both join sides consume it, and without materialization
    each side recomputes the full signature pipeline (exchange reuse does
    not fire across the a/b aliases under AQE) — measured 2x the signature
    cost.  localCheckpoint, not persist(): checkpointed blocks are
    reclaimed by the ContextCleaner once the DataFrame goes out of scope,
    whereas persist() pins CacheManager entries for the session unless
    every caller remembers to unpersist.  On a real cluster swap for
    reliable .checkpoint() so executor loss cannot kill the lineage-less
    frame.
    """
    from esgopeta_spark.session import ensure_min_partitions

    df = ensure_min_partitions(df)
    banded = banded_signatures(df, text_col, id_col, num_hashes, bands, shingle_n, vectorized)
    banded = banded.localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact Jaccard verification of candidate pairs.

    Shingles are recomputed only for docs that appear in a candidate pair
    (left-semi prune BEFORE the shingle projection) — after LSH the
    candidate set is ~linear, so this is a small fraction of the corpus.
    """
    cand_ids = (
        df_pairs.select(F.col("id_a").alias("_cid"))
        .unionByName(df_pairs.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    # NOTE: no ensure_min_partitions here — its partition probe (.rdd)
    # finalizes the AQE plan of this JOIN, materializing the candidate
    # pipeline a second time (measured 2x).  The candidate set is ~linear
    # in dup count anyway; verify inherits the join's parallelism.
    needed = docs.join(cand_ids, docs[id_col] == cand_ids["_cid"], "left_semi")
    # hashed-gram shingles: Jaccard over the hash set equals Jaccard over
    # the gram strings (modulo 64-bit collisions) at ~10x less cost
    sh = needed.select(
        F.col(id_col).alias("_jid"),
        F.array_distinct(shingle_hashes(F.col(text_col), n)).alias("_sh"),
    )
    # the shingle relation feeds BOTH pair sides; without a cut the
    # semi-join + shingling recomputes per side (the DSIR/entropy/LM
    # lesson; 1.13x at sf0.1 idle where candidates are few — at real
    # scale the recompute doubles the verify stage)
    sh = sh.localCheckpoint()
    out = (
        df_pairs.join(sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_sh", "_sh_a"), "id_a")
        .join(sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_sh", "_sh_b"), "id_b")
        .withColumn("_inter", F.size(F.array_intersect("_sh_a", "_sh_b")))
        .withColumn("_union", F.size(F.array_union("_sh_a", "_sh_b")))
        # empty-vs-empty (both docs shorter than n words) = 0, not 1: no
        # shared content is not evidence of duplication (exact_dedup owns
        # the identical-short-text case)
        .withColumn("jaccard", F.when(F.col("_union") > 0, F.col("_inter") / F.col("_union")).otherwise(F.lit(0.0)))
    )
    return out.select("id_a", "id_b", "jaccard")


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact Jaccard >= threshold.

    Candidates are materialized (localCheckpoint — see
    minhash_lsh_candidates for why not persist): the verify stage consumes
    them three times (two id-projections for the semi-prune + the pair
    join itself).
    """
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, shingle_n).localCheckpoint()
    return ngram_jaccard(cand, df, text_col, id_col, shingle_n).filter(F.col("jaccard") >= threshold)


def brute_force_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.7, shingle_n: int = 3) -> DataFrame:
    """O(n²) oracle for tests at tiny SF — NOT for scale."""
    sh = df.select(F.col(id_col).alias("_jid"), shingles(F.col(text_col), shingle_n).alias("_sh"))
    a = sh.select(F.col("_jid").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sh.select(F.col("_jid").alias("id_b"), F.col("_sh").alias("_sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("_inter", F.size(F.array_intersect("_sh_a", "_sh_b")))
        .withColumn("_union", F.size(F.array_union("_sh_a", "_sh_b")))
        .withColumn("jaccard", F.when(F.col("_union") > 0, F.col("_inter") / F.col("_union")).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles, pure expressions.

    For each of 64 bit positions, sum +1/-1 votes from each shingle's
    xxhash64 bit; the fingerprint bit is the vote sign.  Expression-only
    (transform/aggregate/shiftright) so it codegens; ~64 aggregates per
    row is fine for fingerprinting batch jobs.
    """
    sh = shingles(col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # ONE aggregate producing a 64-wide vote vector (a per-bit sum of ±1),
    # then fold votes into the fingerprint.  Keeping this a single
    # expression instead of 64 separate aggregates matters: plan size and
    # codegen compile time stay O(1) in the bit width.
    # Bit masks as long literals; bit 63 is the sign-bit mask (-2^63 —
    # +2^63 would overflow a signed long).
    masks = [1 << i for i in range(63)] + [-(2**63)]
    mask_arr = F.array(*[F.lit(m).cast("long") for m in masks])
    zeros = F.array(*[F.lit(0) for _ in range(64)])
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            mask_arr,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    bits = F.zip_with(
        votes,
        mask_arr,
        lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc.bitwiseOR(b))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def banded_hamming_pairs(
    fp: DataFrame,
    max_hamming: int = 3,
    id_col: str = "_id",
    fp_col: str = "_fp",
    chunk_bits: int = 16,
    n_chunks: int = 4,
) -> DataFrame:
    """Pairs within ``max_hamming`` of a fingerprint relation
    ``(id, fp)``: band the fingerprint into ``n_chunks`` chunks of
    ``chunk_bits`` bits, EQUI-join on chunks, verify exact Hamming
    distance.  Pigeonhole guarantees FULL recall only while
    max_hamming < n_chunks; larger thresholds keep the banded shape but
    only surface pairs sharing some chunk (the documented trade the
    existing hamming=6 SimHash entry makes).  Shared by SimHash text
    near-dup and dHash image near-dup (64-bit, 4x16) and the 32-bit
    portable SimHash (4x8) — never all-pairs; the join is bucketed by
    chunk value, the 100 TB shape."""
    mask = (1 << chunk_bits) - 1
    fp = fp.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    chunks = fp.select(
        "_id",
        "_fp",
        F.explode(
            F.array(*[F.struct(F.lit(c).alias("c"), F.shiftright("_fp", c * chunk_bits).bitwiseAND(F.lit(mask)).alias("v")) for c in range(n_chunks)])
        ).alias("ch"),
    ).select("_id", "_fp", "ch.c", "ch.v")
    # materialize: both self-join sides read this, and the fingerprint
    # (a 64-wide vote aggregate / an image decode) is the expensive
    # producer; localCheckpoint over persist for ContextCleaner reclaim
    # (see minhash_lsh_candidates)
    chunks = chunks.localCheckpoint()
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.v") == F.col("b.v")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), hamming64(F.col("a._fp"), F.col("b._fp")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_candidates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: 64-bit shingle-vote fingerprint, then
    the shared banded Hamming equi-join (``banded_hamming_pairs``)."""
    from esgopeta_spark.session import ensure_min_partitions

    df = ensure_min_partitions(df)
    fp = df.select(F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_fp"))
    return banded_hamming_pairs(fp, max_hamming)


# ---------------------------------------------------------------------------
# portable-hash variants (r10): md5-derived lanes instead of xxhash64, so
# DuckDB can recompute the IDENTICAL signatures/fingerprints and the
# entries get hash-exact oracles.  xxhash64 stays the production path
# (cheaper JVM hash); these prove the LSH machinery cross-engine and
# serve engines without xxhash64.  Recall parity between the two hash
# families is pinned in tests/test_llm_ops.py.
# ---------------------------------------------------------------------------

PORTABLE_P = (1 << 61) - 1  # Mersenne prime; (a*g + b) % P stays < 2^63


def md5_hash32(col: Column) -> Column:
    """First 8 md5 hex chars as a BIGINT in [0, 2^32) — the md5 trick
    every split/fingerprint oracle uses, now as the gram/word hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def portable_lane_consts(k: int, seed: int = 2026) -> tuple[list[int], list[int]]:
    """Deterministic (A, B) hash-family constants shared by the Spark
    expressions and the generated oracle SQL.  A < 2^30 keeps A*g < 2^62
    for 32-bit g, so a*g + b never overflows int64 on either engine."""
    x, consts = seed, []
    for _ in range(2 * k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        consts.append(x)
    A = [1 + (consts[2 * i] % ((1 << 30) - 1)) for i in range(k)]
    B = [consts[2 * i + 1] % PORTABLE_P for i in range(k)]
    return A, B


def portable_minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, band, bh) banded MinHash rows on md5-derived lanes: gram
    hash g = md5_hash32(gram string), lane k = min((A_k*g + B_k) % P),
    band hash = md5 of the '_'-joined lane values.  Docs with no
    full-length gram are EXCLUDED (an empty shingle set must not pair —
    the r4 lesson; the sentinel signature would bucket all short docs
    together).

    r14 (optimization): the gram stream is EXPLODED to (doc, gram-hash)
    rows and the k lane mins are ONE groupBy with k ``min`` aggregates —
    all codegen, map-side partial aggregation, one narrow shuffle of
    (id, 16 longs).  The previous shape (gram-hash array + a
    ``filter(size > 0)`` + per-lane interpreted HOF mins over an eager
    localCheckpoint) hit a Catalyst trap: the size>0 filter on the
    DERIVED array column was pushed below the widening repartition into
    the scan-side Filter, so the whole gram+md5 expression ran TWICE —
    and the filter copy ran on the pre-repartition single-split scan,
    serially (measured 6.5 s vs 0.6 s for the identical rows at sf0.1).
    Exploding needs no empty-set filter at all (empty arrays emit no
    rows), so nothing heavy is left for predicate pushdown to clone.
    Values are bit-identical: min over the distinct gram multiset and
    the same integer lane recurrence."""
    A, B = portable_lane_consts(num_hashes)
    rows = num_hashes // bands
    gh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("_g"),
    ).select("_id", md5_hash32(F.col("_g")).alias("_g32"))
    lanes = gh.groupBy("_id").agg(
        *[
            F.min((F.lit(A[k]) * F.col("_g32") + F.lit(B[k])) % F.lit(PORTABLE_P)).alias(
                f"_m{k}"
            )
            for k in range(num_hashes)
        ]
    )
    return lanes.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws("_", *[F.col(f"_m{b * rows + r}") for r in range(rows)])
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bh")


def minhash_lsh_candidates_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Portable-hash twin of ``minhash_lsh_candidates`` — identical
    banded equi-join shape, md5 lanes, hash-exact DuckDB oracle
    (``portable_minhash_pairs_sql`` emits the same computation)."""
    banded = portable_minhash_bands(df, text_col, id_col, num_hashes, bands, shingle_n)
    banded = banded.localCheckpoint()
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def portable_minhash_pairs_sql(
    num_hashes: int = 16, bands: int = 4, shingle_n: int = 3, table: str = "documents"
) -> str:
    """DuckDB oracle for ``minhash_lsh_candidates_portable``: the SAME
    normalization, gram build, md5 gram hash, (A*g+B)%P lane mins, band
    md5, and banded self-join — generated from the shared constants so
    the two engines run one computation."""
    A, B = portable_lane_consts(num_hashes)
    rows = num_hashes // bands
    mins = ",\n             ".join(
        f"MIN(({A[k]} * g + {B[k]}) % {PORTABLE_P}) AS m{k}" for k in range(num_hashes)
    )
    bhs = ",\n             ".join(
        "md5("
        + " || '_' || ".join(f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f") AS bh{b}"
        for b in range(bands)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, bh{b} AS bh FROM bh" for b in range(bands)
    )
    return f"""
    WITH nd AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM {table}
    ), w AS (
      SELECT doc_id, CASE WHEN length(norm) = 0 THEN CAST([] AS VARCHAR[])
                          ELSE string_split(norm, ' ') END AS ws
      FROM nd
    ), gr AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(ws[i : i + {shingle_n - 1}], ' ')
                                   for i in range(1, len(ws) - {shingle_n - 2})])) AS gram
      FROM w WHERE len(ws) >= {shingle_n}
    ), gh AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(gram), 1, 8)) AS UBIGINT) AS BIGINT) AS g
      FROM gr
    ), l AS (
      SELECT doc_id, {mins}
      FROM gh GROUP BY doc_id
    ), bh AS (
      SELECT doc_id, {bhs} FROM l
    ), br AS (
      {band_rows}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM br a JOIN br b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    """


def simhash32_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(_id, _fp) 32-bit portable SimHash: per-word md5_hash32 votes
    weighted by the word's count, fingerprint bit = vote sign.  One
    (doc, word) groupBy then ONE per-doc aggregate of 32 conditional
    sums — fully codegen, no Python.  Docs with no word are excluded
    (same no-content-no-pair posture as the portable MinHash)."""
    wc = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select("_id", md5_hash32(F.col("w")).alias("h"), "c")
    )
    votes = wc.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, F.col("c")).otherwise(
                    -F.col("c")
                )
            ).alias(f"_v{b}")
            for b in range(32)
        ]
    )
    fp = F.lit(0).cast("bigint")
    for b in range(32):
        fp = fp + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("bigint")
    return votes.select("_id", fp.alias("_fp"))


def simhash_candidates_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Portable-hash twin of ``simhash_candidates``: 32-bit md5-vote
    fingerprint, banded Hamming equi-join on 4x8-bit chunks (pigeonhole
    full recall for hamming <= 3)."""
    fp = simhash32_portable(df, text_col, id_col)
    return banded_hamming_pairs(fp, max_hamming, chunk_bits=8, n_chunks=4).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


def portable_simhash_pairs_sql(max_hamming: int = 3, table: str = "documents") -> str:
    """DuckDB oracle for ``simhash_candidates_portable`` — same word
    counts, md5 bit votes, fingerprint fold, 4x8 chunk join, exact
    bit_count verify."""
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h & {1 << b}) <> 0 THEN c ELSE -c END) AS v{b}"
        for b in range(32)
    )
    fold = "\n               + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(32)
    )
    return f"""
    WITH nd AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM {table}
    ), wrd AS (
      SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM nd
    ), wc AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM wrd WHERE w <> '' GROUP BY doc_id, w
    ), v AS (
      SELECT doc_id, {votes}
      FROM wc GROUP BY doc_id
    ), fp AS (
      SELECT doc_id,
             {fold} AS fp
      FROM v
    ), ch AS (
      SELECT doc_id, fp, c, (fp >> (8 * c)) & 255 AS val
      FROM fp, (SELECT unnest([0, 1, 2, 3]) AS c)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
    FROM ch a JOIN ch b ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


def edit_distance_keys(
    df: DataFrame,
    text_col: str = "title",
    id_col: str = "doc_id",
    max_dist: int = 2,
    lcp: int = 0,
    lcp_col: str | None = None,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The PassJoin key projection shared by the batch self-join and
    the streaming bucket handler: one row per (role, i, ell, p, _id,
    _t) where role 1 = the string's own k+1 segments (index side) and
    role 2 = every +-k-shifted same-shaped substring for every
    candidate indexed length (probe side).  Stream-safe (no checkpoint
    here); strings shorter than lcp + k+1 are excluded (see
    ``edit_distance_pairs``).

    r11 shape (verdict #7): the keys come from ONE posexplode over a
    literal (role, i, o, d) parameter array with a single shared
    substring expression — not the former (2k+1)^2(k+1)+k+1 unrolled
    struct hull, whose ~7 s of whole-stage-codegen compile was the
    entry's flat fixed floor (the n-gram posexplode lesson).  Emitted
    keys are IDENTICAL.

    ``lcp`` (verdict #6): a corpus-constant prefix of that length is
    folded INTO segment 0 — segment boundaries even-split the SUFFIX
    [lcp, L) and segment 0 extends left to position 0 — so no segment
    lies wholly inside the boilerplate and every key keeps
    distinguishing content (the r10-measured 31x pathology: a
    corpus-constant segment's bucket degenerates toward all-pairs).
    The pigeonhole argument is boundary-agnostic — any partition into
    k+1 segments works as long as index and probe share the shape
    function — so recall stays COMPLETE and the output exact for any
    lcp; lcp=0 reproduces the classic even split bit-for-bit.

    ``lcp_col`` (r12, verdict #4): the fold amount as a PER-ROW column
    (the per-family boilerplate path) instead of the corpus-global
    constant; ``key_cols`` ride through to the output so the caller
    can scope the join (a family key).  The per-row shape is sound
    ONLY when both join sides of a sought pair carry the same value —
    which family-scoped joins guarantee by construction."""
    k = int(max_dist)
    nparts = k + 1
    lcp_expr = (
        F.col(lcp_col).cast("bigint") if lcp_col is not None
        else F.lit(int(lcp)).cast("bigint")
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        F.length(text_col).cast("bigint").alias("_L"),
        lcp_expr.alias("_lcp"),
        *[F.col(c) for c in key_cols],
    ).filter(F.length(text_col) >= F.col("_lcp") + F.lit(nparts))

    params = [(1, i, 0, 0) for i in range(nparts)] + [
        (2, i, o, d)
        for o in range(-k, k + 1)
        for i in range(nparts)
        for d in range(-k, k + 1)
    ]
    params_sql = "array(" + ",".join(
        f"named_struct('role',{r},'i',{i},'o',{o},'d',{d})"
        for r, i, o, d in params
    ) + ")"
    ex = base.select(
        "_id", "_t", "_L", "_lcp", *key_cols,
        F.explode(F.expr(params_sql)).alias("_prm")
    ).select(
        "_id", "_t", "_L", "_lcp", *key_cols,
        F.col("_prm.role").alias("role"), F.col("_prm.i").alias("i"),
        F.col("_prm.o").alias("_o"), F.col("_prm.d").alias("_d"),
    )
    ell = F.col("_L") + F.col("_o")  # role 1 has o=0: ell = own length
    suf = ell - F.col("_lcp")
    su_i = F.floor((suf * F.col("i")) / F.lit(nparts)).cast("int")
    su_i1 = F.floor((suf * (F.col("i") + 1)) / F.lit(nparts)).cast("int")
    start = (
        F.when(F.col("i") == 0, F.lit(0)).otherwise(F.col("_lcp") + su_i)
        + F.col("_d")
    ).cast("int")
    plen = (
        su_i1 - su_i
        + F.when(F.col("i") == 0, F.col("_lcp")).otherwise(F.lit(0))
    ).cast("int")
    p = F.when(
        (start >= 0) & (plen > 0) & (start + plen <= F.col("_L")),
        F.col("_t").substr(start + F.lit(1), plen),
    )
    return (
        ex.select("_id", "_t", "role", "i", ell.alias("ell"), p.alias("p"),
                  *key_cols)
        .filter(F.col("p").isNotNull())
    )


def corpus_lcp(df: DataFrame, text_col: str) -> int:
    """Length of the longest common prefix shared by EVERY string in
    the column — computed from one (min, max) aggregate: the common
    prefix of all strings equals the common prefix of the
    lexicographic extremes.  One 1-row collect (bounded driver state,
    the codebook discipline); NULLs ignored."""
    row = df.select(
        F.min(text_col).alias("lo"), F.max(text_col).alias("hi")
    ).collect()[0]
    lo, hi = row["lo"] or "", row["hi"] or ""
    n = min(len(lo), len(hi))
    i = 0
    while i < n and lo[i] == hi[i]:
        i += 1
    return i


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "title",
    id_col: str = "doc_id",
    max_dist: int = 2,
    lcp: int | str = "auto",
    family_col: str | None = None,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` — the
    PassJoin partition pigeonhole (Li et al. 2011, public): split each
    string into k+1 even segments; if edit(s,t) <= k, at least one
    segment of s is untouched by every edit and appears VERBATIM in t,
    shifted by at most k positions.  So the INDEX side emits its own
    (segment_ordinal, own_length, segment) keys and the PROBE side
    emits, for every candidate indexed length within +-k of its own and
    every shift in [-k, k], the same-shaped substring keys — an EQUI
    join on short string keys, never all-pairs.  Candidates are then
    verified with the exact ``F.levenshtein`` (JVM codegen; the oracle
    verifies with DuckDB's independent implementation).  Returns
    (id_a, id_b, dist), id_a < id_b — exact and COMPLETE for strings of
    length >= k+1 (every segment nonempty, so the pigeonhole holds);
    shorter strings are EXCLUDED (an untouched segment of a length-2
    string can be the empty string, which matches nothing — route
    degenerate strings through exact_dedup instead).

    Scale shape: (2k+1)^2 * (k+1) probe keys per row (75 at k=2) of
    ~|s|/(k+1) chars, one equi shuffle, distinct on candidate pairs,
    then the verify projection — linear in candidates.  The base
    relation feeds both join sides: checkpointed once.

    SKEW CAVEAT (r10-measured), AUTOMATED in r11 (verdict #6): a
    segment whose content is CORPUS-CONSTANT (boilerplate prefixes —
    'quarterly report ...' on every title) is a useless signature: its
    bucket holds the whole length class and the candidate set
    degenerates toward all-pairs (31x growth sf0.01->sf0.1 on a
    shared-prefix fixture vs 2.2x on a diverse one — SCALE.md r10).
    ``lcp="auto"`` (default) measures the corpus-wide common prefix
    from one (min, max) aggregate and folds it into segment 0's
    boundary (see ``edit_distance_keys``) so every segment keeps
    distinguishing content; recall stays complete (the pigeonhole is
    boundary-agnostic) and the output identical — only the candidate
    volume changes.  The auto statistic is corpus-GLOBAL: one outlier
    title without the boilerplate zeroes it (then behavior = classic
    even split); Pass ``lcp=0`` to
    force the classic split (the streaming twin's default — a stream
    cannot see corpus statistics; compute offline and pass in, the NB
    model pattern).

    ``family_col`` (r12, verdict #4 — per-FAMILY boilerplate): when a
    grouping column is given, pairs are sought WITHIN each family only
    (the family joins as an extra equi key) and the boilerplate
    statistic is computed PER FAMILY from one (min, max, min-length)
    group aggregate, each family's own prefix folding into its
    segment-0 boundary.  One outlier family no longer zeroes every
    other family's fold.  Within-family recall stays COMPLETE (both
    sides of any sought pair share the family and therefore the shape
    function); cross-family pairs are out of the operator's declared
    scope — the production shape, since per-host/per-source template
    titles are exactly what must NOT merge across families.  The
    family->lcp map is bounded driver state (the codebook/NB-model
    discipline, <= 100k families)."""
    k_ = int(max_dist)
    fam_keys: tuple[str, ...] = ()
    if family_col is not None:
        fam_keys = (family_col,)
        if lcp == "auto":
            rows = (
                df.groupBy(family_col)
                .agg(
                    F.min(text_col).alias("lo"),
                    F.max(text_col).alias("hi"),
                    F.min(F.length(text_col)).alias("mn"),
                )
                .collect()
            )
            if len(rows) > 100_000:
                raise ValueError(
                    f"family_col {family_col!r} has {len(rows)} families — "
                    "beyond the bounded driver-state contract"
                )
            fam_lcp = []
            for r in rows:
                lo, hi = r["lo"] or "", r["hi"] or ""
                n = min(len(lo), len(hi))
                i = 0
                while i < n and lo[i] == hi[i]:
                    i += 1
                fam_lcp.append(
                    (r[family_col],
                     max(0, min(i, int(r["mn"] or 0) - (k_ + 1))))
                )
            from pyspark.sql.types import IntegerType, StructField, StructType

            lcp_schema = StructType(
                [df.schema[family_col], StructField("_fam_lcp", IntegerType())]
            )
            lcp_df = df.sparkSession.createDataFrame(fam_lcp, lcp_schema)
            src = df.join(F.broadcast(lcp_df), family_col)
            keyed = edit_distance_keys(
                src, text_col, id_col, max_dist,
                lcp_col="_fam_lcp", key_cols=fam_keys,
            )
        else:
            keyed = edit_distance_keys(
                df, text_col, id_col, max_dist, lcp=int(lcp),
                key_cols=fam_keys,
            )
    else:
        if lcp == "auto":
            mn = df.select(F.min(F.length(text_col)).alias("m")).collect()[0]["m"]
            lcp = 0 if mn is None else max(
                0, min(corpus_lcp(df, text_col), int(mn) - (k_ + 1))
            )
        keyed = edit_distance_keys(df, text_col, id_col, max_dist, lcp=int(lcp))
    keyed = keyed.localCheckpoint()
    k = int(max_dist)
    idx = keyed.filter(F.col("role") == 1)
    probe = keyed.filter(F.col("role") == 2)

    join_cond = (
        (F.col("a.i") == F.col("b.i"))
        & (F.col("a.ell") == F.col("b.ell"))
        & (F.col("a.p") == F.col("b.p"))
        & (F.col("a._id") != F.col("b._id"))
    )
    for fk in fam_keys:
        join_cond = join_cond & (F.col(f"a.{fk}") == F.col(f"b.{fk}"))
    cands = (
        idx.alias("a")
        .join(probe.alias("b"), join_cond)
        .select(
            F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
            F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
            F.when(F.col("a._id") < F.col("b._id"), F.col("a._t")).otherwise(F.col("b._t")).alias("t_a"),
            F.when(F.col("a._id") < F.col("b._id"), F.col("b._t")).otherwise(F.col("a._t")).alias("t_b"),
        )
        .distinct()
    )
    return cands.select(
        "id_a", "id_b", F.levenshtein("t_a", "t_b").cast("int").alias("dist")
    ).filter(F.col("dist") <= k)


# ---------------------------------------------------------------------------
# pair -> group clustering (connected components)
# ---------------------------------------------------------------------------


def dup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "minlabel",
    checkpoint: str = "local",
) -> DataFrame:
    """Cluster near-dup PAIRS into canonical GROUPS: connected components
    by iterative min-label propagation (default), or alternating
    large-star/small-star rounds (``algorithm='star'``) for extreme-scale
    pair graphs — see ``dup_components_star``; a property test pins that
    both return identical components.

    Returns (id, comp) for every id that appears in a pair; comp = the
    smallest id reachable through the pair graph (the canonical keeper).
    Singletons never enter the pair set and keep themselves by definition
    — left-join this result and coalesce to id.

    Each round: (1) labels flow one hop along edges, (2) a pointer-jump
    (comp := comp of comp) halves remaining chain lengths — converging in
    O(log diameter) rounds instead of diameter rounds (measured on the
    sf0.1 embeddings pair graph: 11 rounds vs 17 plain).  The convergence
    check is fused into the round's single action (a changed-flag
    aggregate over the round result).

    **Every round ends in an EAGER localCheckpoint.**  This is the
    load-bearing line: persist() caches *execution* but leaves the
    *logical plan* growing 3× per round, and Catalyst re-analysis of the
    compounding plan dominates wall-clock within ~3 iterations (measured:
    3s → 18s → 60s+ per round without truncation; constant ~0.2s with).
    localCheckpoint materializes to executor storage and hands back a
    leaf plan.  On a real cluster pass ``checkpoint="reliable"``
    (operators/checkpoint.py: sc.setCheckpointDir + .checkpoint()) so a
    lost executor doesn't kill the lineage-less frame; same loop shape,
    identical values (pinned in tests/test_llm_ops.py).  At extreme
    scale the round body swaps for alternating large-star/small-star
    (``algorithm='star'`` below; same driver loop shape).
    """
    from esgopeta_spark.operators.checkpoint import materialize

    if algorithm == "star":
        return dup_components_star(pairs, id_a, id_b, max_iter, checkpoint)
    if algorithm != "minlabel":
        raise ValueError(f"unknown algorithm {algorithm!r} (minlabel|star)")
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = materialize(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
        checkpoint,
    )
    labels = materialize(
        edges.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id")),
        checkpoint,
    )
    for _ in range(max_iter):
        prop = edges.join(labels, edges["dst"] == labels["id"]).select(
            F.col("src").alias("id"), F.col("comp")
        )
        cand = labels.unionByName(prop).groupBy("id").agg(F.min("comp").alias("comp"))
        ptr = cand.select(F.col("id").alias("comp"), F.col("comp").alias("_pc"))
        jump = cand.join(ptr, "comp", "left").select(
            "id", F.least(F.col("comp"), F.coalesce("_pc", F.col("comp"))).alias("comp")
        )
        merged = (
            jump.alias("n")
            .join(labels.alias("o"), "id")
            .select(
                F.col("id"),
                F.col("n.comp").alias("comp"),
                (F.col("n.comp") != F.col("o.comp")).alias("_chg"),
            )
        )
        # lazy: the convergence aggregate below materializes the
        # checkpoint AND returns the changed flag in ONE job/round
        merged = materialize(merged, checkpoint, eager=False)
        changed = merged.agg(F.max(F.col("_chg").cast("int")).alias("c")).collect()[0]["c"]
        labels = merged.drop("_chg")
        if not changed:
            break
    return labels


def dup_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint: str = "local",
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the extreme-scale alternative to min-label propagation.

    Why it exists: min-label + pointer-jumping needs O(log diameter)
    rounds, but each round's label join keys on *edges*, so a hot
    component (one near-dup cluster with millions of members — common in
    boilerplate-heavy crawls) funnels its whole edge set through few
    reducers every round.  The star rounds rewrite the EDGE SET itself
    toward min-rooted stars: each round is two groupBy-min + equi-join
    passes keyed by node, edges shrink monotonically toward one edge per
    non-root node, and skew flattens as high-degree nodes collapse into
    roots.  Converges in O(log n) rounds on any topology.

    Round body (all equi-joins + partial aggregates, no cartesian):
    - large-star: for every directed edge (u,v) with v > u, reattach v to
      m(u) = min(Γ(u) ∪ {u})
    - small-star: direct edges large->small; reattach every smaller
      neighbor (and u itself) to m(u)

    Convergence = edge multiset stable, checked with a (count,
    hash-sum) fingerprint — one tiny aggregate per round fused with the
    round's materializing action (same eager-localCheckpoint discipline
    as min-label: the plan must not compound across rounds).

    Returns (id, comp) with comp = the component's smallest id — the
    same contract (and bit-identical output, pinned by
    tests/test_llm_ops.py) as ``dup_components``.
    """
    und = pairs.select(
        F.least(F.col(id_a), F.col(id_b)).alias("src"),
        F.greatest(F.col(id_a), F.col(id_b)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    from esgopeta_spark.operators.checkpoint import materialize

    nodes = materialize(
        und.select(F.col("src").alias("id"))
        .unionByName(und.select(F.col("dst").alias("id")))
        .distinct(),
        checkpoint,
    )
    edges = materialize(und.distinct(), checkpoint)
    fingerprint = None
    for _ in range(max_iter):
        # ---- large-star ----
        bidir = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = bidir.groupBy("src").agg(F.min("dst").alias("_mn"))
        large = (
            bidir.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(
                F.col("dst").alias("_u"),
                F.least(F.col("_mn"), F.col("src")).alias("_v"),
            )
        )
        ls = (
            large.where(F.col("_u") != F.col("_v"))
            .select(
                F.least("_u", "_v").alias("src"), F.greatest("_u", "_v").alias("dst")
            )
            .distinct()
        )
        # ---- small-star (edges already directed small<large; group by the
        # LARGE endpoint, reattach its smaller neighbors to their min) ----
        dir_ls = ls.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        mins2 = dir_ls.groupBy("u").agg(F.min("v").alias("_mn"))
        reattached = dir_ls.join(mins2, "u").select(
            F.col("v").alias("_u"), F.col("_mn").alias("_v")
        )
        self_edge = mins2.select(F.col("u").alias("_u"), F.col("_mn").alias("_v"))
        new_edges = materialize(
            reattached.unionByName(self_edge)
            .where(F.col("_u") != F.col("_v"))
            .select(
                F.least("_u", "_v").alias("src"), F.greatest("_u", "_v").alias("dst")
            )
            .distinct(),
            checkpoint,
            eager=False,
        )
        # one action materializes the round AND returns the fingerprint
        # (bit_xor: order-free and overflow-free under ANSI mode, sound on
        # a distinct edge set)
        row = new_edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        edges = new_edges
        new_fp = (row["n"], row["h"])
        if new_fp == fingerprint:
            break
        fingerprint = new_fp
    # converged: every component is a star rooted at its min (root has only
    # larger neighbors, members have exactly the root as smaller neighbor)
    comp = (
        edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .groupBy("src")
        .agg(F.min("dst").alias("_m"))
        .select(F.col("src").alias("id"), F.least(F.col("src"), F.col("_m")).alias("comp"))
    )
    return nodes.join(comp, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )


def dedup_keepers(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full near-dup dedup resolution: every doc id -> its canonical
    keeper (smallest id in its dup cluster; itself when unpaired)."""
    comp = dup_components(pairs)
    return docs.select(F.col(id_col).alias("id")).join(comp, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("keeper")
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: str = "local",
    broadcast_max_rows: int = 4_000_000,
) -> DataFrame:
    """Verbatim cross-document span detection — the EXACT-substring half
    of training-data dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499, public): emit every
    full-length word n-gram WITH ITS POSITION, keep grams that appear in
    >= ``min_docs`` distinct documents, and report per-document stats of
    the duplicated spans (how many window occurrences sit inside shared
    text, how many distinct shared grams, where the first one starts).

    Differs from MinHash/Jaccard (document-level similarity estimate):
    this finds literal repeated passages — boilerplate headers, licence
    blocks, templated spam — even inside otherwise-unique documents.

    Scale shape: one projection explodes each doc into (pos, gram) rows
    (~n_words rows per doc); ONE partial-aggregated shuffle keyed by gram
    computes distinct-doc counts; the surviving shared-gram set joins
    back onto the gram stream.  That set's size is DATA-DEPENDENT and
    unbounded — on a templated web corpus with ``min_docs=2`` it can
    reach billions of rows — so the broadcast hint is SIZE-GATED: the
    shared set is materialized (it feeds the join anyway), counted, and
    broadcast only when it holds at most ``broadcast_max_rows`` rows
    (default 4M ~= 32 MB of 8-byte keys); above that the join falls back
    to a plain shuffle join, where AQE may still promote a genuinely
    small side at runtime — the gate removes only the forced-hint OOM
    path (broadcast hints bypass autoBroadcastJoinThreshold).  Gram keys
    are already hashed (md5-60bit, engine-portable) so shuffle rows stay
    narrow at any scale; swap to ``sha2(gram, 256)`` only if a 10^9-gram
    corpus pushes the 2^61 collision bound.
    """
    grams = _positioned_grams(docs, n, text_col, id_col, checkpoint)
    shared = _shared_gram_keys(grams, min_docs, checkpoint, broadcast_max_rows)
    return (
        grams.join(shared, "gkey")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.countDistinct("gkey").alias("n_dup_grams"),
            F.min("pos").alias("first_dup_pos"),
        )
    )


def _positioned_grams(
    docs: DataFrame, n: int, text_col: str, id_col: str, checkpoint: str
) -> DataFrame:
    """(doc_id, pos, gkey) stream of positioned word n-grams, materialized.

    Grams shuffle as a 60-bit integer key — the first 15 hex chars of
    md5(gram) — instead of the ~50-char gram string (r6; locally NEUTRAL,
    the win is narrow shuffle rows at scale).  md5 exists on BOTH engines,
    so oracles group on the IDENTICAL key and any hash collision (odds
    ~n²/2^61) collapses the same pair of grams on both sides —
    parity-safe by construction.

    Materialize-once discipline: the gram stream feeds both the
    shared-gram aggregate and a join-back, and the windowed slice+concat
    explode is the dominant cost — recomputing it doubles the whole query
    (measured 8-11s -> 5.4s at sf0.1).  Same checkpoint="local"|"reliable"
    durability knob as the other materializing operators.
    """
    from esgopeta_spark.session import ensure_min_partitions

    # r14 (optimization): the windowed slice+concat explode below is the
    # dominant per-row cost; over a single-row-group scan it would run on
    # ONE input split, serially (no-op on real multi-split inputs)
    docs = ensure_min_partitions(docs)
    words = F.split(normalize_text(F.col(text_col)), " ")
    windows = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(windows).alias("pos", "gram")
    ).select(
        "doc_id", "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint").alias("gkey"),
    )
    from esgopeta_spark.operators.checkpoint import materialize

    return materialize(grams, checkpoint)


def _shared_gram_keys(
    grams: DataFrame, min_docs: int, checkpoint: str, broadcast_max_rows: int
) -> DataFrame:
    """gkeys appearing in >= min_docs distinct docs, broadcast size-gated.

    shared is data-dependent and unbounded, so the broadcast hint is
    applied only under ``broadcast_max_rows`` (forced hints bypass
    autoBroadcastJoinThreshold — the gate removes the OOM path; the
    shuffle fallback can still be AQE-promoted).  Materializing it here is
    not extra work — the join consumes it next and the count is O(1) on
    the materialized blocks.
    """
    from esgopeta_spark.operators.checkpoint import materialize

    shared = (
        grams.groupBy("gkey")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(int(min_docs)))
        .select("gkey")
    )
    shared = materialize(shared, checkpoint)
    if shared.count() <= int(broadcast_max_rows):
        shared = F.broadcast(shared)
    return shared


def duplicated_span_ranges(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: str = "local",
    broadcast_max_rows: int = 4_000_000,
) -> DataFrame:
    """The REMOVAL half of exact-substring dedup (Lee et al. 2022,
    arXiv:2107.06499): merge overlapping/adjacent duplicated n-gram
    windows into maximal spans and emit their exact coordinates —
    ``(doc_id, span_id, start_word, end_word, start_char, end_char,
    n_windows)`` — where word indices are 0-based positions in the
    normalized text's whitespace tokens, ``end_*`` are EXCLUSIVE, and
    char offsets index the NORMALIZED text (lowercased, whitespace
    collapsed — the canonical form every dedup operator here shares).

    ``duplicated_ngram_spans`` reports per-doc counts; this emits the
    ranges a cleaning pass consumes (see ``remove_duplicated_spans``).

    Scale shape: the gram stream and shared-gram set are the same
    size-gated pipeline as ``duplicated_ngram_spans``; the merge step is
    a classic gaps-and-islands over ONE window partitioned by doc_id
    (running max of window-ends, island breaks where a window starts past
    it) — a single extra shuffle keyed by doc, no self-join, no python.
    Char offsets come from one join back to the docs relation projecting
    only the word array (column-pruned scan).
    """
    grams = _positioned_grams(docs, n, text_col, id_col, checkpoint)
    shared = _shared_gram_keys(grams, min_docs, checkpoint, broadcast_max_rows)
    dup = grams.join(shared, "gkey").select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(n)).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.withColumn(
        "_new", F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    ).withColumn(
        "span_id", F.sum("_new").over(w_doc.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = islands.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("start_word"),
        (F.max("pos") + F.lit(n)).alias("end_word"),
        F.count(F.lit(1)).alias("n_windows"),
    )
    # char offsets in the normalized text: a prefix of k>0 words spans
    # length(concat_ws(' ', first k words)) chars; word k starts one
    # space later.  slice is 1-based; slice(words, 1, 0) = [] so the
    # start_word=0 case folds into the same expression (length 0, no +1).
    words = F.split(normalize_text(F.col(text_col)), " ")
    docw = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    sw, ew = F.col("start_word"), F.col("end_word")
    return (
        spans.join(docw, "doc_id")
        .select(
            "doc_id",
            "span_id",
            sw.cast("bigint").alias("start_word"),
            ew.cast("bigint").alias("end_word"),
            F.when(sw == 0, F.lit(0))
            .otherwise(F.length(F.concat_ws(" ", F.slice(F.col("_w"), 1, sw))) + 1)
            .cast("bigint")
            .alias("start_char"),
            F.length(F.concat_ws(" ", F.slice(F.col("_w"), 1, ew)))
            .cast("bigint")
            .alias("end_char"),
            F.col("n_windows").cast("bigint").alias("n_windows"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: str = "local",
    broadcast_max_rows: int = 4_000_000,
) -> DataFrame:
    """Apply exact-substring removal: drop every word inside a duplicated
    span and re-join the survivors — the actual cleaning step of Lee et
    al. 2022.  One row per input doc: ``(doc_id, clean_text, n_spans,
    n_removed_words, n_kept_words)`` where clean_text is the normalized
    text with span words removed (empty string when everything was
    duplicated; the full normalized text when nothing was).

    Scale shape: spans collapse to ONE bounded array per doc (spans per
    doc <= n_words / 1, in practice tiny), joined LEFT onto docs so
    clean docs pass through untouched; the word filter is a JVM-side
    higher-order ``filter`` with an index lambda over that array — no
    python, no explode of the full word stream.
    """
    spans = duplicated_span_ranges(
        docs, n, min_docs, text_col, id_col, checkpoint, broadcast_max_rows
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_word", "end_word")).alias("_sp"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    sp = F.coalesce(
        F.col("_sp"),
        F.array().cast("array<struct<start_word:bigint,end_word:bigint>>"),
    )
    kept = F.filter(
        F.col("_w"),
        lambda w, i: ~F.exists(
            sp, lambda s: (i >= s["start_word"]) & (i < s["end_word"])
        ),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(" ", kept).alias("clean_text"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint").alias("n_spans"),
            (F.size("_w") - F.size(kept)).cast("bigint").alias("n_removed_words"),
            F.size(kept).cast("bigint").alias("n_kept_words"),
        )
    )


def incremental_dedup(
    prior: DataFrame,
    incr: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot-INCREMENTAL exact dedup — the operational shape at
    100 TB, where yesterday's keeper set is already materialized and
    only today's crawl increment is new work: each increment row dedups
    (a) against the prior store (prior ALWAYS wins — a re-crawled
    duplicate never displaces an existing keeper, so downstream shard
    assignments and training mixes stay stable across snapshots) and
    (b) within the increment (lowest id wins, the exact_dedup rule).

    Returns one verdict row per increment doc: (id, status, keeper_id)
    with status 'dup_prior' (hash already kept in prior — keeper is the
    prior keeper), 'new' (first of its hash, unseen in prior — its own
    keeper), or 'dup_incr' (loses to a lower-id increment row).

    Scale shape: prior collapses once to (hash, keeper) — in practice
    that relation IS the store you maintain between snapshots; the
    increment takes one hash window + one hash-equi left join against
    it.  Work is O(increment) plus the join probe — the whole point:
    the full corpus never rescans.  sha2-256 keys (the exact_dedup
    birthday-bound argument)."""
    h = F.sha2(normalize_text(F.col(text_col)), 256)
    prior_keep = (
        prior.select(h.alias("_th"), F.col(id_col))
        .groupBy("_th")
        .agg(F.min(id_col).alias("_prior_keeper"))
    )
    iw = Window.partitionBy("_th")
    im = incr.select(F.col(id_col), h.alias("_th")).withColumn(
        "_incr_min", F.min(id_col).over(iw)
    )
    out = im.join(prior_keep, "_th", "left")
    status = (
        F.when(F.col("_prior_keeper").isNotNull(), F.lit("dup_prior"))
        .when(F.col(id_col) == F.col("_incr_min"), F.lit("new"))
        .otherwise(F.lit("dup_incr"))
    )
    return out.select(
        id_col,
        status.alias("status"),
        F.coalesce("_prior_keeper", "_incr_min").cast("bigint")
        .alias("keeper_id"),
    )


def decontaminate_minhash(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_n: int = 3,
    threshold_milli: int = 200,
    portable: bool = True,
) -> DataFrame:
    """FUZZY benchmark decontamination (the near-dup tier above
    ``contamination_overlap``'s exact n-gram probe: verbatim leaks
    share grams, paraphrase-lite leaks with small edits need the
    near-dup machinery): banded MinHash on BOTH relations, a BIPARTITE
    band-equi join (corpus x eval collisions only — never corpus x
    corpus, never all-pairs), then EXACT word-n-gram Jaccard
    verification of every candidate, kept at >= ``threshold_milli``.

    Returns (corpus_id, eval_id, jaccard_milli).  With
    ``portable=True`` every stage is the portable-md5 twin
    computation, so a DuckDB oracle (:func:`portable_decontam_sql`)
    replays it hash-exactly — candidates, verification, and threshold
    included; this tier is by-design ~6x dearer (md5-per-gram) and is
    the ORACLE-SCALE path.  ``portable=False`` is the production tier:
    the same shape on JVM-xxhash64 signatures (``banded_signatures``),
    pytest-pinned to equal recall on the injected-leak class.

    Scale shape: the eval set is SMALL (a benchmark), so its banded
    rows broadcast; the corpus pays one signature pass + the band
    probe; exact verification touches only candidate docs (semi-prune
    before the gram explode).

    LSH parameters: ``num_hashes``/``bands`` default PER TIER —
    portable 16/4 (oracle-scale md5 lanes), production 64/16 (the
    cheap-lane JVM path keeps more bands for recall).  A caller that
    passes them EXPLICITLY gets exactly those values in EITHER tier,
    so the two tiers are comparable at matched LSH parameters
    (r12, per ADVICE: the production tier previously clamped to
    64/16 silently)."""
    if num_hashes is None:
        num_hashes = 16 if portable else 64
    if bands is None:
        bands = 4 if portable else 16
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    # r14: no checkpoint on the corpus band relation — it feeds exactly
    # one consumer (the candidate join below), so the materialization
    # bought nothing and its eager job cost a full extra pass
    if portable:
        cb = portable_minhash_bands(
            corpus, text_col, id_col, num_hashes, bands, shingle_n
        )
        eb = portable_minhash_bands(
            eval_set, text_col, id_col, num_hashes, bands, shingle_n
        )
    else:
        cb = banded_signatures(
            corpus, text_col, id_col, num_hashes, bands, shingle_n
        )
        eb = banded_signatures(
            eval_set, text_col, id_col, num_hashes, bands, shingle_n
        )
    cands = (
        cb.alias("c")
        .join(
            F.broadcast(eb.alias("e")),
            (F.col("c.band") == F.col("e.band")) & (F.col("c.bh") == F.col("e.bh")),
        )
        .select(
            F.col("c._id").alias("corpus_id"), F.col("e._id").alias("eval_id")
        )
        .distinct()
    ).localCheckpoint()

    def grams(df, idc):
        g = df.select(
            F.col(id_col).alias(idc),
            F.explode(
                F.array_distinct(shingles(F.col(text_col), shingle_n))
            ).alias("g"),
        )
        return g

    cg = grams(
        corpus.join(cands.select("corpus_id").distinct(),
                    F.col(id_col) == F.col("corpus_id"), "left_semi"),
        "corpus_id",
    )
    eg = grams(
        eval_set.join(cands.select("eval_id").distinct(),
                      F.col(id_col) == F.col("eval_id"), "left_semi"),
        "eval_id",
    )
    csize = cg.groupBy("corpus_id").agg(F.count("*").alias("na"))
    esize = eg.groupBy("eval_id").agg(F.count("*").alias("nb"))
    inter = (
        cands.join(cg, "corpus_id")
        .join(eg, ["eval_id", "g"])
        .groupBy("corpus_id", "eval_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(csize), "corpus_id")
        .join(F.broadcast(esize), "eval_id")
        .select(
            "corpus_id", "eval_id",
            F.expr("(inter * 1000) DIV (na + nb - inter)").cast("bigint")
            .alias("jaccard_milli"),
        )
        .where(F.col("jaccard_milli") >= F.lit(int(threshold_milli)))
    )


def portable_decontam_sql(
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold_milli: int = 200,
    corpus_pred: str = "source <> 'src19'",
    eval_pred: str = "source = 'src19'",
    table: str = "documents",
    src_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`decontaminate_minhash`: the SAME
    normalization / gram build / md5 lanes / band md5 / bipartite band
    join / exact-Jaccard verify / integer-milli threshold, generated
    from the shared constants.  ``src_sql`` (optional) overrides the
    (doc_id, side, text) source relation — callers that CONSTRUCT
    their corpus (e.g. injected leak fixtures) pass the same
    construction here."""
    A, B = portable_lane_consts(num_hashes)
    rows = num_hashes // bands
    mins = ",\n             ".join(
        f"MIN(({A[k]} * g + {B[k]}) % {PORTABLE_P}) AS m{k}"
        for k in range(num_hashes)
    )
    bhs = ",\n             ".join(
        "md5("
        + " || '_' || ".join(f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f") AS bh{b}"
        for b in range(bands)
    )
    band_rows = "\n      UNION ALL ".join(
        f"SELECT doc_id, side, {b} AS band, bh{b} AS bh FROM bh"
        for b in range(bands)
    )
    if src_sql is None:
        src_sql = f"""
      SELECT doc_id,
             CASE WHEN {corpus_pred} THEN 'c' ELSE 'e' END AS side,
             text
      FROM {table}
      WHERE ({corpus_pred}) OR ({eval_pred})"""
    return f"""
    WITH src AS (
      {src_sql}
    ), nd AS (
      SELECT doc_id, side,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM src
    ), w AS (
      SELECT doc_id, side,
             CASE WHEN length(norm) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE string_split(norm, ' ') END AS ws
      FROM nd
    ), gr AS (
      SELECT doc_id, side,
             unnest(list_distinct([array_to_string(ws[i : i + {shingle_n - 1}], ' ')
                                   for i in range(1, len(ws) - {shingle_n - 2})])) AS gram
      FROM w WHERE len(ws) >= {shingle_n}
    ), gh AS (
      SELECT doc_id, side,
             CAST(CAST(('0x' || substr(md5(gram), 1, 8)) AS UBIGINT) AS BIGINT) AS g
      FROM gr
    ), l AS (
      SELECT doc_id, side, {mins}
      FROM gh GROUP BY doc_id, side
    ), bh AS (
      SELECT doc_id, side, {bhs} FROM l
    ), br AS (
      {band_rows}
    ), cand AS (
      SELECT DISTINCT c.doc_id AS corpus_id, e.doc_id AS eval_id
      FROM br c JOIN br e
        ON c.band = e.band AND c.bh = e.bh AND c.side = 'c' AND e.side = 'e'
    ), sz AS (
      SELECT doc_id, side, COUNT(*) AS n FROM gr GROUP BY doc_id, side
    ), inter AS (
      SELECT cand.corpus_id, cand.eval_id, COUNT(*) AS i
      FROM cand
      JOIN gr gc ON gc.doc_id = cand.corpus_id AND gc.side = 'c'
      JOIN gr ge ON ge.doc_id = cand.eval_id AND ge.side = 'e'
                AND ge.gram = gc.gram
      GROUP BY cand.corpus_id, cand.eval_id
    )
    SELECT inter.corpus_id, inter.eval_id,
           CAST((i * 1000) // (sc.n + se.n - i) AS BIGINT) AS jaccard_milli
    FROM inter
    JOIN sz sc ON sc.doc_id = inter.corpus_id AND sc.side = 'c'
    JOIN sz se ON se.doc_id = inter.eval_id AND se.side = 'e'
    WHERE (i * 1000) // (sc.n + se.n - i) >= {threshold_milli}
    """
