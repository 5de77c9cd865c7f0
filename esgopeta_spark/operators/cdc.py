"""Content-defined chunking (CDC) dedup — the chunk-level half of corpus
dedup for BINARY/code corpora (public technique: Rabin fingerprint
chunking; gear-hash variant per FastCDC, Xia et al., USENIX ATC'16).

Fixed-width chunking breaks on a single inserted byte (every later chunk
shifts); CDC cuts where a rolling hash of the trailing 64 bytes hits a
mask, so boundaries RE-SYNCHRONIZE after any local edit and identical
regions of different files produce identical chunks — which is what
makes chunk-hash dedup work on near-identical files (vendored deps,
forked code files, re-uploaded tarballs).

Scale shape: chunking is one Arrow mapInPandas kernel (the gear hash is
fully VECTORIZED: the window hash at every position is built from 64
shifted vector adds, then the sparse boundary-candidate list is walked
once for the min/max constraints — no per-byte python).  Chunk-hash
aggregation is one partial-agg shuffle keyed by the 32-byte sha256 (no
birthday risk at corpus scale, same rationale as exact_dedup).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic gear table: 256 64-bit constants from a fixed-seed
# generator (the table's only requirement is fixed, well-mixed bits)
_GEAR = (
    np.random.default_rng(0x9E3779B97F4A7C15 % (2**32))
    .integers(0, 2**63, size=256, dtype=np.int64)
    .astype(np.uint64)
    * np.uint64(2)
    + np.uint64(1)
)

_WINDOW = 64  # rolling-hash window (bytes); hash = sum gear[b[i]] << age


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """uint64 window hash at every byte position (vectorized): h[n] =
    sum_{j=0..63} gear[data[n-j]] << j (mod 2^64), the closed form of
    the sequential h = (h << 1) + gear[b] recurrence over a 64-byte
    window (older contributions shift out of the 64-bit word)."""
    g = _GEAR[data]
    acc = np.zeros(len(data), dtype=np.uint64)
    for j in range(_WINDOW):
        if j >= len(data):
            break
        acc[j:] += g[: len(data) - j] << np.uint64(j)
    return acc


def cdc_boundaries(
    data: bytes, min_size: int = 64, avg_size: int = 256, max_size: int = 1024
) -> list[int]:
    """Chunk end offsets (exclusive, ascending, last == len(data)).
    A cut happens at the first position >= min_size where the window
    hash has ``log2(avg_size)`` high zero bits; a chunk is force-cut at
    max_size.  Empty input -> []."""
    n = len(data)
    if n == 0:
        return []
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    # boundary test on the TOP log2(avg_size) bits: the gear recurrence
    # mixes upward (h = (h << 1) + gear[b]), so the high bits carry the
    # whole window while the low bits see only the newest bytes — the
    # FastCDC-style mask placement
    shift = np.uint64(64 - int(np.log2(avg_size)))
    h = _gear_hashes(np.frombuffer(data, dtype=np.uint8))
    cand = np.nonzero((h >> shift) == 0)[0] + 1  # cut AFTER the position
    out = []
    start = 0
    ci = 0
    while start < n:
        ci = int(np.searchsorted(cand, start + min_size))
        if ci < len(cand) and cand[ci] - start <= max_size:
            end = int(cand[ci])
        else:
            end = min(start + max_size, n)
        out.append(min(end, n))
        start = out[-1]
    return out


def cdc_chunk_table(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """One row per content-defined chunk: (id, chunk_idx, offset, length,
    chunk_hash sha256-hex).  Binary or string payloads (strings chunk
    over their utf-8 bytes)."""
    out_schema = (
        f"{id_col} bigint, chunk_idx int, offset bigint, length bigint, chunk_hash string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                data = b.encode() if isinstance(b, str) else bytes(b)
                start = 0
                for i, end in enumerate(cdc_boundaries(data, min_size, avg_size, max_size)):
                    rows.append(
                        (int(did), i, start, end - start,
                         hashlib.sha256(data[start:end]).hexdigest())
                    )
                    start = end
            yield pd.DataFrame(
                rows, columns=[id_col, "chunk_idx", "offset", "length", "chunk_hash"]
            ).astype({id_col: "int64", "chunk_idx": "int32",
                      "offset": "int64", "length": "int64"})

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def cdc_dedup_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """Corpus-level chunk dedup accounting: one row per DISTINCT chunk
    with its occurrence count, byte size, distinct-doc reach, and the
    keeper (smallest id, smallest offset) — the inputs a dedup store or
    a near-identical-file report needs.  One partial-agg shuffle on the
    chunk hash."""
    ch = cdc_chunk_table(df, payload_col, id_col, min_size, avg_size, max_size)
    return ch.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct(id_col).alias("n_docs"),
        F.min("length").alias("chunk_bytes"),
        F.min(F.struct(id_col, "offset")).alias("_k"),
    ).select(
        "chunk_hash", "n_copies", "n_docs", "chunk_bytes",
        F.col(f"_k.{id_col}").alias("keeper_id"),
        F.col("_k.offset").alias("keeper_offset"),
        ((F.col("n_copies") - 1) * F.col("chunk_bytes")).alias("dedup_savings_bytes"),
    )


def cdc_file_pairs(
    df: DataFrame,
    min_shared_chunks: int = 3,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """File-level near-dup by shared content: two docs pair when they
    share >= ``min_shared_chunks`` distinct chunk hashes — the CDC
    resynchronization property makes shared REGIONS of otherwise
    different files (vendored deps, forked sources, re-uploads with new
    headers) produce identical chunks.  Same scale shape as the video
    shared-frame join: chunk-hash stream -> equi-self-join on the hash ->
    per-pair distinct count; never all-pairs."""
    ch = (
        cdc_chunk_table(df, payload_col, id_col, min_size, avg_size, max_size)
        .select(F.col(id_col).alias("_id"), "chunk_hash")
        .distinct()
    )
    ch = ch.localCheckpoint()  # both join sides read the chunking output
    a, b = ch.alias("a"), ch.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        # plain count: both join sides are already .distinct() on
        # (id, hash) — see video_dup_pairs (r8 review)
        .agg(F.count(F.lit(1)).alias("n_shared_chunks"))
        .filter(F.col("n_shared_chunks") >= F.lit(int(min_shared_chunks)))
    )
