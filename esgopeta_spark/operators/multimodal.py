"""Multimodal column plumbing (SURVEY.md §2 G5).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside; heavy per-item work (decode, resize,
feature-extract, frame-sample) runs in Arrow-batched ``mapInPandas`` so
executors stream record batches without materializing a partition.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed: ``decode_image_meta`` parses the (real)
header bytes it can, and the deterministic fake feature extractor is
clearly marked.  The Spark-side contract — schema, batch iteration,
partition sizing — is real and tested; swapping the kernel body for a
real codec changes nothing structurally.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake corpus: PNG-like headers + pseudo-payload bytes.
    Stands in for a real binary-column table in tests."""
    rows = []
    for i in range(n):
        payload = b"\x89PNG\r\n\x1a\n" + bytes([(i * 7 + j) % 256 for j in range(128)])
        rows.append(
            (i, "image", payload, (32 + i % 8, 32 + (i // 8) % 8, None, None, "png"))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas kernel: sniff payload magic + sizes per Arrow batch.

    Real decode (PIL.Image.open) would replace the body marked below; the
    iterator shape, schema, and batch flow are production-real.
    """
    out_schema = "media_id bigint, format_sniffed string, payload_bytes int, is_png boolean"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # --- STUB KERNEL: header sniff only; a real codec goes here ---
            is_png = payloads.map(lambda b: b is not None and bytes(b[:8]) == b"\x89PNG\r\n\x1a\n")
            fmt = is_png.map(lambda p: "png" if p else "unknown")
            nbytes = payloads.map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format_sniffed": fmt,
                    "payload_bytes": nbytes.astype("int32"),
                    "is_png": is_png,
                }
            )

    return df.mapInPandas(kernel, out_schema)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic FAKE feature extractor (marked; a CNN/CLIP encoder
    would replace the body): hashes payload bytes into a float vector.
    Proves the binary -> array<float> pipeline shape at scale."""
    out_schema = f"media_id bigint, feature array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                raw = np.frombuffer(bytes(b or b""), dtype=np.uint8)
                # --- STUB KERNEL: deterministic fold into `dim` buckets ---
                acc = np.zeros(dim, dtype=np.float64)
                if raw.size:
                    idx = np.arange(raw.size) % dim
                    np.add.at(acc, idx, raw)
                    acc = acc / max(raw.size, 1)
                feats.append(acc.astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(kernel, out_schema)


def resize_images(df: DataFrame, max_side: int = 224) -> DataFrame:
    """mapInPandas resize kernel: aspect-preserving target dimensions are
    computed for real (the part a pipeline plans partitioning and memory
    around); the pixel resample itself is the stubbed codec step — the
    payload passes through unchanged, where PIL's ``Image.resize`` would
    produce the re-encoded bytes.
    """
    out_schema = (
        "media_id bigint, width int, height int, out_width int, out_height int, payload binary"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"] or 0)
            h = pdf["meta"].map(lambda m: m["height"] or 0)
            scale = (max_side / pd.concat([w, h], axis=1).max(axis=1).clip(lower=1)).clip(upper=1.0)
            ow = (w * scale).round().astype("int32").clip(lower=1)
            oh = (h * scale).round().astype("int32").clip(lower=1)
            # --- STUB KERNEL: real resample (PIL Image.resize) goes here ---
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": ow,
                    "out_height": oh,
                    "payload": pdf["payload"],
                }
            )

    return df.mapInPandas(kernel, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode timestamps to sample without
    decoding (decode itself is the stubbed kernel above).  Shows the
    partitioning story: one row per (video, frame_ts), repartitionable by
    media_id for codec locality."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms")
    )


def raise_if_real_decode_requested():
    raise NotImplementedError(
        "real image/audio decode requires PIL/librosa/ffmpeg, which this "
        "container does not ship; the mapInPandas kernels above are the "
        "integration points"
    )
