"""Multimodal graded entries (SURVEY.md §2 G5).

The driver's testdata has no binary media table, so these entries derive
deterministic image corpora FROM a testdata table: each selected
``documents`` row becomes a gradient image whose pixels are a closed-form
function of ``doc_id``.  PNG (lossless) is graded on exact pixel sums;
JPEG (lossy) on the lossless invariants (dimensions), with fidelity
pinned separately by PSNR tests.  The Spark side runs the REAL codec path —
``encode_png`` (stdlib zlib, cycling through all five scanline filters)
then ``decode_png`` inside an Arrow-batched ``mapInPandas`` kernel — and
reports decoded dimensions plus the integer pixel sum.  The DuckDB
oracle computes the same invariants analytically (a generate_series
double sum), so a hash match proves the encode->decode round trip is
bit-exact on every image: any filter/unfilter bug, CRC slip or channel
swap changes the pixel sum.

Determinism: all-integer outputs (widths, heights, pixel sums), no
doubles anywhere (catalog.py rules).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd  # module-level so PEP 563 string hints resolve

from pyspark.sql import functions as F

from esgopeta_spark.plans.catalog import T, register


@register(
    "multimodal_decode_jpeg",
    "G5",
    """
    SELECT doc_id,
           CAST(8 + doc_id % 11 AS INTEGER) AS width,
           CAST(8 + doc_id % 5  AS INTEGER) AS height
    FROM documents WHERE doc_id % 20 = 10
    """,
    doc="REAL baseline-JPEG round trip (operators/jpeg.py — pure numpy "
    "DCT + canonical Huffman, no codec library), graded on the LOSSLESS "
    "invariants: per selected doc, build the gradient image, encode_jpeg "
    "(4:2:0 for odd docs, 4:4:4 even), decode_jpeg, emit decoded "
    "dimensions; pixel values are lossy so fidelity is pinned by PSNR "
    "bounds in tests/test_codecs.py instead.  Same no-shuffle "
    "mapInPandas plan shape as multimodal_decode_png",
)
def multimodal_decode_jpeg(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 20 == 10).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = "doc_id bigint, width int, height int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            ids_, ws, hs = [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 11, 8 + d % 5
                yy, xx = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [(xx * 5 + d) % 256, (yy * 3 + 2 * d) % 256, (xx + yy + d) % 256],
                    axis=-1,
                ).astype(np.uint8)
                # selected ids are all ≡10 (mod 20): vary subsampling by the
                # id's 20-block so both 4:4:4 and 4:2:0 paths are graded
                back = codecs.decode_jpeg(
                    codecs.encode_jpeg(arr, quality=88, subsample=bool((d // 20) % 2))
                )
                ids_.append(d)
                ws.append(back.shape[1])
                hs.append(back.shape[0])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids_, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return ids.mapInPandas(kernel, out_schema)


@register(
    "multimodal_decode_png",
    "G5",
    """
    WITH sel AS (
      SELECT doc_id,
             8 + doc_id % 13 AS w,
             8 + doc_id % 7  AS h
      FROM documents WHERE doc_id % 20 = 0)
    SELECT s.doc_id,
           CAST(s.w AS INTEGER) AS width,
           CAST(s.h AS INTEGER) AS height,
           CAST(SUM((xs.x * 7 + s.doc_id) % 256
                  + (ys.y * 5 + 2 * s.doc_id) % 256
                  + (xs.x + ys.y + 3 * s.doc_id) % 256) AS BIGINT) AS pixel_sum
    FROM sel s, generate_series(0, 19) xs(x), generate_series(0, 13) ys(y)
    WHERE xs.x < s.w AND ys.y < s.h
    GROUP BY s.doc_id, s.w, s.h
    """,
    doc="REAL PNG round trip, graded: per selected doc, build the "
    "deterministic gradient image, encode_png (stdlib zlib; scanline "
    "filter = (doc_id // 10) %% 5, so all five filters are exercised across the "
    "corpus), decode_png, emit decoded dims + integer pixel sum; the "
    "oracle computes the same sums analytically.  Plan: pruned 1-column "
    "scan -> widened partitions -> one Arrow mapInPandas kernel, no "
    "shuffle, no collect — the 100 TB shape for per-item media work",
)
def multimodal_decode_png(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 20 == 0).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = "doc_id bigint, width int, height int, pixel_sum bigint"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            ids_, ws, hs, sums = [], [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 13, 8 + d % 7
                yy, xx = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [(xx * 7 + d) % 256, (yy * 5 + 2 * d) % 256, (xx + yy + 3 * d) % 256],
                    axis=-1,
                ).astype(np.uint8)
                # (d // 10) % 5: selected ids are all ≡0 (mod 20), so d % 5
                # would pin ONE filter — the 20-block index walks all five
                back = codecs.decode_png(codecs.encode_png(arr, filter_type=(d // 10) % 5))
                ids_.append(d)
                ws.append(back.shape[1])
                hs.append(back.shape[0])
                sums.append(int(back.sum(dtype=np.int64)))
            # explicit dtypes: an empty batch must still carry typed columns
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids_, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return ids.mapInPandas(kernel, out_schema)


@register(
    "multimodal_decode_gif",
    "G5",
    """
    WITH sel AS (
      SELECT doc_id,
             8 + doc_id % 11 AS w,
             8 + doc_id % 5  AS h
      FROM documents WHERE doc_id % 20 = 0)
    SELECT s.doc_id,
           CAST(s.w AS INTEGER) AS width,
           CAST(s.h AS INTEGER) AS height,
           CAST(SUM(  (((xs.x + ys.y + s.doc_id) % 16) * 17) % 256
                    + (((xs.x + ys.y + s.doc_id) % 16) * 31) % 256
                    + (((xs.x + ys.y + s.doc_id) % 16) * 7 + s.doc_id) % 256
                   ) AS BIGINT) AS pixel_sum
    FROM sel s, generate_series(0, 17) xs(x), generate_series(0, 11) ys(y)
    WHERE xs.x < s.w AND ys.y < s.h
    GROUP BY s.doc_id, s.w, s.h
    """,
    doc="REAL GIF round trip: per selected doc, build a 16-color palette "
    "image, encode_gif (from-scratch variable-width LZW), decode_gif, emit "
    "decoded dims + integer pixel sum; the oracle computes the same sums "
    "analytically from the palette arithmetic.  Same no-shuffle mapInPandas "
    "shape as the graded PNG twin",
)
def multimodal_decode_gif(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 20 == 0).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = "doc_id bigint, width int, height int, pixel_sum bigint"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            ids_, ws, hs, sums = [], [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 11, 8 + d % 5
                yy, xx = np.mgrid[0:h, 0:w]
                pal = np.stack(
                    [(np.arange(16) * 17) % 256, (np.arange(16) * 31) % 256, (np.arange(16) * 7 + d) % 256],
                    axis=-1,
                ).astype(np.uint8)
                arr = pal[(xx + yy + d) % 16]
                back = codecs.decode_gif(codecs.encode_gif(arr))
                ids_.append(d)
                ws.append(back.shape[1])
                hs.append(back.shape[0])
                sums.append(int(back.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids_, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return ids.mapInPandas(kernel, out_schema)


@register(
    "multimodal_decode_mjpeg",
    "G5",
    None,  # JPEG frame quantization is codec-fidelity, not SQL-expressible;
    # PSNR + exact-constant-frame behavior pinned in tests/test_codecs.py
    doc="REAL mp4 video-frame decode (Motion-JPEG subset): per selected doc, "
    "build a 3-frame MJPEG mp4 with our fixture muxer, walk the sample "
    "tables, decode every frame with the from-scratch JPEG codec "
    "(codecs.decode_mjpeg_frames via the sample_video_frames kernel) and "
    "emit per-frame dims + luma stats.  Same no-shuffle mapInPandas shape "
    "as the graded PNG/GIF round trips; rows-only because JPEG quantization "
    "is not SQL-reproducible",
)
def multimodal_decode_mjpeg(spark, sf):
    from esgopeta_spark.operators.multimodal import sample_video_frames
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 40 == 0).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = "media_id bigint, payload binary, kind string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            mids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w = 8 + d % 5, 8 + d % 9
                yy, xx = np.mgrid[0:h, 0:w]
                frames = [
                    np.stack(
                        [(xx * 3 + d + i * 20) % 256, (yy * 5 + d) % 256, (xx + yy + i) % 256],
                        axis=-1,
                    ).astype(np.uint8)
                    for i in range(3)
                ]
                mids.append(d)
                payloads.append(codecs.encode_mjpeg_mp4(frames, fps=10))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "kind": pd.Series(["video"] * len(mids), dtype="object"),
                }
            )

    media = ids.mapInPandas(gen, out_schema)
    return sample_video_frames(media, max_frames=3).orderBy("media_id", "frame_idx")


@register(
    "multimodal_decode_jpeg_progressive",
    "G5",
    """
    SELECT doc_id,
           CAST(8 + doc_id % 11 AS INTEGER) AS width,
           CAST(8 + doc_id % 5  AS INTEGER) AS height,
           TRUE AS matches_baseline
    FROM documents WHERE doc_id % 7 = 3
    """,
    doc="REAL progressive-JPEG (SOF2) round trip, oracle-checked (r5; post-window parity + pytest): per selected "
    "doc, build the gradient image, encode with the libjpeg-style "
    "progressive scan script (spectral selection + successive approximation, "
    "4:2:0 for odd docs), decode through the multi-scan SOF2 path, and "
    "assert the decode is PIXEL-IDENTICAL to the baseline SOF0 round trip "
    "of the same image — the coefficients are the same, so a correct "
    "progressive decoder must reassemble them exactly.  The oracle predicts "
    "dims + an all-true identity column; any refinement-pass bug flips "
    "matches_baseline and fails the hash",
)
def multimodal_decode_jpeg_progressive(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    # % 7 == 3 selects BOTH parities (so 4:4:4 and 4:2:0 both run) and
    # varies doc_id mod 5/11 (every height/width in the formula occurs)
    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 7 == 3).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = "doc_id bigint, width int, height int, matches_baseline boolean"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            ids_, ws, hs, same = [], [], [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 11, 8 + d % 5
                yy, xx = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [(xx * 7 + d) % 256, (yy * 5 + 2 * d) % 256, (xx + yy + 3 * d) % 256],
                    axis=-1,
                ).astype(np.uint8)
                sub = d % 2 == 1
                prog = codecs.decode_jpeg(
                    codecs.encode_jpeg_progressive(arr, quality=85, subsample=sub)
                )
                base = codecs.decode_jpeg(codecs.encode_jpeg(arr, quality=85, subsample=sub))
                ids_.append(d)
                ws.append(prog.shape[1])
                hs.append(prog.shape[0])
                same.append(bool(np.array_equal(prog, base)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids_, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "matches_baseline": pd.Series(same, dtype="bool"),
                }
            )

    return ids.mapInPandas(kernel, out_schema)


@register(
    "multimodal_decode_mp3_audio",
    "G5",
    """
    SELECT doc_id,
           CAST(3 AS INTEGER) AS layer,
           CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS INTEGER) AS sample_rate,
           CAST((1 + doc_id % 3) * 1152 + 576 AS BIGINT) AS n_samples,
           CAST((doc_id // 20) % 2 = 1 AS BOOLEAN) AS short_blocks,
           TRUE AS fidelity_ok
    FROM documents WHERE doc_id % 20 = 7
    """,
    doc="REAL MPEG-1 Layer III (mp3) round trip, graded: per selected doc, "
    "synthesize a deterministic tone, encode to Layer III frames (side info, "
    "bit reservoir, Huffman-coded big_values/count1 regions, hybrid MDCT; "
    "window-switching schedule alternates by the id's 20-block, and every "
    "other short-block doc upgrades to MIXED blocks — r9: block_type 2 + "
    "mixed_block_flag, subbands 0-1 long-coded), decode "
    "back (operators/mpeg1_audio.py) and emit the decoded sample count "
    "(analytic: k source frames + the MDCT-delay/ramp-out padding = "
    "k*1152 + 576) and a >30 dB round-trip SNR flag the oracle asserts "
    "TRUE.  Plan: pruned 1-column scan -> widened partitions -> one Arrow "
    "mapInPandas kernel, no shuffle, no collect — the 100 TB shape for "
    "per-item media work",
)
def multimodal_decode_mp3_audio(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 20 == 7).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = (
        "doc_id bigint, layer int, sample_rate int, n_samples bigint, "
        "short_blocks boolean, fidelity_ok boolean"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs, mpeg1_audio

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                rate = mpeg1_audio.SAMPLE_RATES[d % 3]
                n_src = 1 + d % 3
                short = (d // 20) % 2 == 1
                mixed = short and (d // 40) % 2 == 1  # r9: exercise mixed blocks
                freq = 250.0 * (1 + d % 6)
                t = np.arange(1152 * n_src) / rate
                pcm = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
                dec, r2 = codecs.decode_mpeg1_audio(
                    codecs.encode_mpeg1_audio(
                        pcm, rate, layer=3, use_short_blocks=short,
                        mixed_blocks=mixed,
                    )
                )
                ref = pcm.astype(np.float64)
                noise = dec[: len(pcm)].astype(np.float64) - ref
                snr = 10 * np.log10(ref.dot(ref) / max(noise.dot(noise), 1e-12))
                out.append(
                    dict(doc_id=d, layer=3, sample_rate=r2, n_samples=len(dec),
                         short_blocks=short, fidelity_ok=bool(snr > 30.0))
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(kernel, out_schema)


@register(
    "multimodal_decode_mp2_audio",
    "G5",
    """
    SELECT doc_id,
           CAST(1 + (doc_id // 20) % 2 AS INTEGER) AS layer,
           CAST(32000 AS INTEGER) AS sample_rate,
           CAST((2 + doc_id % 3) * (CASE WHEN (doc_id // 20) % 2 = 0
                                         THEN 384 ELSE 1152 END) AS BIGINT) AS n_samples,
           TRUE AS fidelity_ok
    FROM documents WHERE doc_id % 20 = 5
    """,
    doc="REAL MPEG-1 audio round trip, graded: per selected doc, synthesize "
    "a deterministic integer-cycle tone (250 Hz multiples), encode to "
    "Layer I or II frames (layer alternates by the id's 20-block), decode "
    "the frames back (operators/mpeg1_audio.py: spec-shaped bitstream, "
    "waterfilled allocations, MDCT filterbank), emit the decoded sample "
    "count (analytic: source frames + the tail-pad frame) and a >25 dB "
    "round-trip SNR flag the oracle asserts TRUE.  Plan: pruned 1-column "
    "scan -> widened partitions -> one Arrow mapInPandas kernel, no "
    "shuffle, no collect — the 100 TB shape for per-item media work",
)
def multimodal_decode_mp2_audio(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 20 == 5).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = "doc_id bigint, layer int, sample_rate int, n_samples bigint, fidelity_ok boolean"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                layer = 1 + (d // 20) % 2
                spf = 384 if layer == 1 else 1152
                n_src = 1 + d % 3
                freq = 250.0 * (1 + d % 6)
                t = np.arange(spf * n_src) / 32000.0
                pcm = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
                dec, rate = codecs.decode_mpeg1_audio(
                    codecs.encode_mpeg1_audio(pcm, 32000, layer=layer)
                )
                ref = pcm.astype(np.float64)
                noise = dec[: len(pcm)].astype(np.float64) - ref
                snr = 10 * np.log10(ref.dot(ref) / max(noise.dot(noise), 1e-12))
                out.append(
                    dict(doc_id=d, layer=layer, sample_rate=rate,
                         n_samples=len(dec), fidelity_ok=bool(snr > 25.0))
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(kernel, out_schema)


@register(
    "dedup_image_dhash",
    "G2,G5",
    """
    WITH sel AS (
      SELECT doc_id, doc_id % 7 AS cls
      FROM documents WHERE doc_id % 10 = 2)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
    FROM sel a JOIN sel b ON a.cls = b.cls AND a.doc_id < b.doc_id
    """,
    doc="IMAGE near-dup (dHash, r8 — G2 dedup extended to the multimodal "
    "corpus): per selected doc, render a class-determined sinusoid image "
    "(7 orientation/frequency classes; brightness shifted by the id's "
    "10-block), encode to REAL PNG bytes, decode + 64-bit dHash "
    "(float-bilinear 9x8 luma, horizontal gradient signs) in one Arrow "
    "mapInPandas kernel, then the SAME banded Hamming equi-join as "
    "SimHash text near-dup (dedup.py banded_hamming_pairs — "
    "pigeonhole-complete for hamming<=3, never all-pairs).  dHash is "
    "EXACTLY brightness-invariant (luma weights sum to 256, unrounded "
    "bilinear), so same-class images pair at hamming 0 across every "
    "brightness variant and the oracle is the analytic class self-join; "
    "cross-class fingerprints sit >=16 bits apart (pinned in pytest), so "
    "no spurious pair can enter under the threshold",
)
def dedup_image_dhash(spark, sf):
    from esgopeta_spark.operators.multimodal import image_dup_pairs
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 2).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        fxy = [(1, 0), (0, 1), (2, 1), (1, 2), (3, 0), (2, 3), (1, 1)]
        for pdf in batches:
            ids_, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                fx, fy = fxy[d % 7]
                k = (d // 10) % 40
                yy, xx = np.mgrid[0:24, 0:32]
                ph = (2 * np.pi * (fx * xx + fy * yy)) / 16.0
                arr = np.stack(
                    [90 + 70 * np.sin(ph), 90 + 70 * np.sin(ph + 1.0), 90 + 70 * np.cos(ph)],
                    axis=-1,
                )
                arr = np.clip(np.round(arr), 0, 255).astype(np.uint8)
                arr = np.clip(arr.astype(np.int64) + k, 0, 255).astype(np.uint8)
                ids_.append(d)
                payloads.append(codecs.encode_png(arr, filter_type=d % 5))
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    pairs = image_dup_pairs(media, max_hamming=3)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))


@register(
    "dedup_audio_fingerprint",
    "G2,G5",
    """
    WITH sel AS (
      SELECT doc_id, (doc_id // 10) % 6 AS cls
      FROM documents WHERE doc_id % 10 = 4)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sel a JOIN sel b ON a.cls = b.cls AND a.doc_id < b.doc_id
    """,
    doc="AUDIO near-dup (r8; r9: SHIFT-ROBUST — G2 dedup extended to "
    "audio): per selected doc, synthesize a class-determined AM tone mix "
    "(6 classes), plant a variant-determined LEADING-SILENCE offset (the "
    "real-corpus duplicate mode: same clip, trimmed/padded lead-in, "
    "different encoder delay), encode to WAV / MPEG-1 Layer II / Layer "
    "III by the id's variant (WAV variants also gain-halved), decode "
    "through the from-scratch codecs and compute the 64-bit onset-"
    "anchored SPECTRAL-PROFILE hash (Hann-windowed per-segment band "
    "energies, integerized, frequency-gradient signs — see "
    "multimodal.audio_fp64) in one Arrow mapInPandas kernel, then the "
    "shared banded Hamming equi-join (banded_hamming_pairs).  The hash "
    "is EXACTLY power-of-two-gain-invariant and, measured, at hamming 0 "
    "across this module's lossy codecs AND +-5000-sample shifts, so "
    "same-class variants always pair under the threshold and the oracle "
    "is the analytic class self-join; cross-class fingerprints sit >= 12 "
    "bits apart (pinned in pytest at sf0.1's id range) so no spurious "
    "pair can enter",
)
def dedup_audio_fingerprint(spark, sf):
    from esgopeta_spark.operators.multimodal import audio_dup_pairs
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 4).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        cls_params = [(300, 2100, 3.0), (450, 1600, 5.0), (600, 3000, 2.0),
                      (250, 5000, 4.0), (800, 1200, 7.0), (350, 4200, 6.0)]
        for pdf in batches:
            ids_, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                m = d // 10
                f1, f2, am = cls_params[m % 6]
                fmt, k = (m // 6) % 3, (m // 18) % 3
                t = np.arange(17 * 512)
                env = 1.0 + 0.5 * np.sin(2 * np.pi * am * t / 32000)
                x = env * (np.sin(2 * np.pi * f1 * t / 32000)
                           + 0.6 * np.sin(2 * np.pi * f2 * t / 32000))
                base = (np.round(x / np.abs(x).max() * 3000) * 4).astype(np.int64)
                # r9: plant a variant-determined leading-silence shift —
                # the onset anchor must pair these across offsets
                base = np.concatenate([np.zeros((d % 7) * 300, dtype=np.int64), base])
                if fmt == 0:  # WAV, exact power-of-two gain variants
                    pay = codecs.encode_wav((base >> k).astype(np.int16), 32000)
                else:  # MPEG-1 Layer II / III round trip feeds the hash
                    pay = codecs.encode_mpeg1_audio(
                        base.astype(np.int16), 32000, layer=2 if fmt == 1 else 3
                    )
                ids_.append(d)
                payloads.append(pay)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    return audio_dup_pairs(media, max_hamming=3).select("id_a", "id_b")


@register(
    "dedup_video_shared_frames",
    "G2,G5",
    """
    WITH sel AS (
      SELECT doc_id, (doc_id // 10) % 6 AS j
      FROM documents WHERE doc_id % 10 = 6)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(CASE WHEN a.j = b.j THEN 3 ELSE 2 END AS BIGINT) AS n_shared_frames
    FROM sel a JOIN sel b
      ON a.doc_id < b.doc_id AND ((a.j - b.j + 6) % 6) IN (0, 1, 5)
    """,
    doc="VIDEO near-dup (r8 — G2 dedup across the last modality): per "
    "selected doc, build a REAL 3-frame Motion-JPEG mp4 whose frames walk "
    "a 6-pattern cycle (video j holds patterns j, j+1, j+2 — adjacent "
    "videos share footage), decode via the sample-table walk + JPEG "
    "codec, dHash every frame, then pair videos sharing >= 2 distinct "
    "frame fingerprints: one equi-self-join on the 64-bit hash + a "
    "per-pair distinct count, never all-pairs.  JPEG encode/decode is "
    "deterministic, so equal patterns give equal fingerprints and the "
    "oracle is the analytic cycle-adjacency join (same j: 3 shared, "
    "j+-1: 2, j+-2: 1 -> filtered); the 6 pattern hashes sit >= 16 bits "
    "apart (pinned in pytest)",
)
def dedup_video_shared_frames(spark, sf):
    from esgopeta_spark.operators.multimodal import video_dup_pairs
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 6).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        fxy = [(1, 0), (0, 1), (2, 1), (1, 2), (3, 0), (2, 3)]

        def pat(j):
            yy, xx = np.mgrid[0:24, 0:32]
            fx, fy = fxy[j]
            ph = (2 * np.pi * (fx * xx + fy * yy)) / 16.0
            arr = np.stack(
                [90 + 70 * np.sin(ph), 90 + 70 * np.sin(ph + 1.0), 90 + 70 * np.cos(ph)],
                axis=-1,
            )
            return np.clip(np.round(arr), 0, 255).astype(np.uint8)

        for pdf in batches:
            ids_, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                j = (d // 10) % 6
                vid = codecs.encode_mjpeg_mp4(
                    [pat(j), pat((j + 1) % 6), pat((j + 2) % 6)], quality=85
                )
                ids_.append(d)
                payloads.append(vid)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    pairs = video_dup_pairs(media, min_shared_frames=2)
    return pairs.select(
        "id_a", "id_b", F.col("n_shared_frames").cast("bigint").alias("n_shared_frames")
    )


@register(
    "multimodal_video_scenes",
    "G5,E5",
    """
    SELECT doc_id AS media_id,
           CAST(4 AS BIGINT) AS n_frames,
           CAST((doc_id // 10) % 3 AS BIGINT) AS n_cuts,
           CAST((doc_id // 10) % 3 + 1 AS BIGINT) AS n_scenes
    FROM documents WHERE doc_id % 10 = 3
    """,
    doc="video scene-change detection (r9): per selected doc, build a "
    "REAL 4-frame Motion-JPEG mp4 with a KNOWN number of hard cuts "
    "((doc_id div 10) mod 3 — frames repeat a sinusoid pattern within a "
    "scene and switch patterns at each cut), decode via the sample-table "
    "walk + JPEG codec, dHash every frame, flag a cut where consecutive "
    "frames' Hamming distance > 8.  JPEG encode/decode is deterministic "
    "so within-scene distance is exactly 0 and the cross-pattern "
    "separation >= 16 bits survives the JPEG round-trip (both pinned in "
    "tests/test_llm_ops.py test_video_scene_stats_known_cuts).  Plan: "
    "one Arrow decode pass, ONE bounded per-video lag window, one "
    "per-video aggregate — no joins; operators/multimodal.py "
    "video_scene_stats",
)
def multimodal_video_scenes(spark, sf):
    from esgopeta_spark.operators.multimodal import video_scene_stats
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 3).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        fxy = [(1, 0), (0, 1), (2, 1), (1, 2), (3, 0), (2, 3)]

        def pat(j):
            yy, xx = np.mgrid[0:24, 0:32]
            fx, fy = fxy[j]
            ph = (2 * np.pi * (fx * xx + fy * yy)) / 16.0
            arr = np.stack(
                [90 + 70 * np.sin(ph), 90 + 70 * np.sin(ph + 1.0), 90 + 70 * np.cos(ph)],
                axis=-1,
            )
            return np.clip(np.round(arr), 0, 255).astype(np.uint8)

        # c cuts in 4 frames: cut positions by class — 0: none,
        # 1: after frame 1, 2: after frames 0 and 2
        cut_sets = [set(), {1}, {0, 2}]
        for pdf in batches:
            ids_, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                c = (d // 10) % 3
                frames, p = [], 0
                for i in range(4):
                    frames.append(pat(p))
                    if i in cut_sets[c]:
                        p += 1
                vid = codecs.encode_mjpeg_mp4(frames, quality=85)
                ids_.append(d)
                payloads.append(vid)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    return video_scene_stats(media, cut_hamming=8).select(
        "media_id", "n_frames", "n_cuts", "n_scenes"
    )


@register(
    "dedup_cdc_file_pairs",
    "G1,G2",
    """
    WITH sel AS (
      SELECT doc_id, (doc_id // 10) % 5 AS cls
      FROM documents WHERE doc_id % 10 = 8)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sel a JOIN sel b ON a.cls = b.cls AND a.doc_id < b.doc_id
    """,
    doc="content-defined-chunking file near-dup (r8; FastCDC-style gear "
    "hash, Xia et al. ATC'16): per selected doc, build a binary payload "
    "with a unique random prefix + a 4 KB class-shared region, chunk it "
    "with the vectorized rolling gear hash (operators/cdc.py — boundary "
    "where the window hash's top log2(avg) bits are zero, min/avg/max "
    "64/256/1024), then pair docs sharing >= 3 distinct sha256 chunk "
    "hashes via one hash equi-self-join.  CDC boundaries RESYNCHRONIZE "
    "after the unique prefix, so every same-class pair shares the "
    "shared-region chunks (measured all-docs intersection >= 5 per "
    "class across the sf0.1 id range) and random cross-class content "
    "shares none — the oracle is the analytic class self-join",
)
def dedup_cdc_file_pairs(spark, sf):
    from esgopeta_spark.operators.cdc import cdc_file_pairs
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 8).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids_, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                cls = (d // 10) % 5
                shared = np.random.default_rng(1000 + cls).integers(
                    0, 256, 4096, dtype=np.uint8
                ).tobytes()
                prefix = np.random.default_rng(d).integers(
                    0, 256, 1024 + (d % 7) * 256, dtype=np.uint8
                ).tobytes()
                ids_.append(d)
                payloads.append(prefix + shared)
            yield pd.DataFrame({"doc_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "doc_id bigint, payload binary")
    return cdc_file_pairs(media, min_shared_chunks=3).select("id_a", "id_b")


@register(
    "dedup_media_keepers",
    "G1,G2,G5",
    """
    WITH sel AS (
      SELECT doc_id, doc_id % 7 AS cls
      FROM documents WHERE doc_id % 10 = 2)
    SELECT s.doc_id AS id,
           MIN(s2.doc_id) AS keeper,
           CAST(s.doc_id > MIN(s2.doc_id) AS BOOLEAN) AS is_dup
    FROM sel s JOIN sel s2 ON s.cls = s2.cls
    GROUP BY s.doc_id
    """,
    doc="END-TO-END media dedup resolution (r8): the image dHash pair "
    "stream feeds the same pair->components->keepers machinery as text "
    "near-dup (dedup.py dup_components min-label propagation + "
    "dedup_keepers): one verdict row per image — its canonical keeper "
    "(smallest id in its duplicate cluster) and an is_dup flag.  Every "
    "same-class image pairs at hamming 0 (brightness-invariant dHash, "
    "pinned), so each class forms ONE component and the oracle is the "
    "analytic per-class min id.  This is the row a 100 TB dedup pass "
    "actually writes back",
)
def dedup_media_keepers(spark, sf):
    from esgopeta_spark.operators.dedup import dedup_keepers
    from esgopeta_spark.plans.catalog import REGISTRY

    # reuse the graded dHash entry's corpus + pair pipeline, then resolve
    pairs = REGISTRY["dedup_image_dhash"].fn(spark, sf).select("id_a", "id_b")
    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 2).select("doc_id")
    out = dedup_keepers(ids, pairs, id_col="doc_id")
    return out.select(
        "id", "keeper", (F.col("id") > F.col("keeper")).alias("is_dup")
    )


_BLOCKLIST = ["table value", "fast key", "scan slow", "the line", "value part", "agg"]


@register(
    "text_blocklist_hits",
    "G4,E2",
    """
    WITH d AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents WHERE doc_id % 10 = 1),
    ph AS (SELECT * FROM (VALUES ('table value'), ('fast key'), ('scan slow'),
                                 ('the line'), ('value part'), ('agg')) AS v(p)),
    hits AS (
      SELECT d.doc_id, ph.p, u.i AS pos
      FROM d, ph, UNNEST(range(1, len(d.t) - len(ph.p) + 2)) AS u(i)
      WHERE substr(d.t, u.i, len(ph.p)) = ph.p)
    SELECT d.doc_id,
           CAST(COUNT(h.p) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT h.p) AS BIGINT) AS n_phrases,
           CAST(COALESCE(MIN(h.pos) - 1, -1) AS BIGINT) AS first_hit_pos
    FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
    GROUP BY d.doc_id
    """,
    doc="multi-pattern blocklist accounting (r8; Aho-Corasick, CACM'75 "
    "classic): per selected doc, count EVERY occurrence of a 6-phrase "
    "blocklist in the normalized text — overlapping and nested matches "
    "included — plus distinct phrases hit and the first hit offset.  The "
    "automaton (operators/matching.py, from-scratch goto/fail/output "
    "construction) matches the whole list in ONE pass per doc, "
    "independent of list size — the corpus-cleaning shape for KB-to-MB "
    "banned-phrase lists broadcast to executors; the oracle mirrors the "
    "all-occurrences semantics with a position scan.  Plan: one "
    "mapInPandas pass, no shuffle, no collect",
)
def text_blocklist_hits(spark, sf):
    from esgopeta_spark.operators.matching import blocklist_hits
    from esgopeta_spark.session import ensure_min_partitions

    docs = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 1)
    return blocklist_hits(ensure_min_partitions(docs), _BLOCKLIST)


@register(
    "unigram_vocab",
    "G4",
    None,  # iterative EM artifact, not SQL-expressible; the distributed
    # trainer is pinned BIT-IDENTICAL to a pure-python reference in
    # test_llm_ops (test_unigram_train_matches_pure_python_reference)
    doc="unigram-LM tokenizer training (r8; SentencePiece-style, Kudo "
    "2018 arXiv:1804.10959 — the OTHER production tokenizer family next "
    "to BPE): substring seeding + hard-EM Viterbi rounds + count-rank "
    "pruning over the one-scan word table (operators/unigram.py); emits "
    "the learned vocabulary (piece, viterbi_count, logprob).  Every EM "
    "round is one Arrow Viterbi pass with the bounded vocab in the "
    "kernel closure + one integer partial-agg shuffle — round cost "
    "independent of corpus size after the first scan.  Rows-only by "
    "design, reference-twin-checked in pytest",
)
def unigram_vocab(spark, sf):
    from esgopeta_spark.operators.unigram import unigram_train

    vocab = unigram_train(
        T(spark, sf, "documents"), vocab_size=200, seed_size=1000, n_iters=3
    )
    return spark.createDataFrame(
        [(i, p, c, lp) for i, (p, c, lp) in enumerate(vocab)],
        "rank int, piece string, viterbi_count bigint, logprob double",
    )


@register(
    "unigram_doc_token_counts",
    "G4",
    None,  # downstream of the iterative vocabulary artifact
    doc="tokenize the corpus with the learned unigram vocabulary "
    "(operators/unigram.py unigram_segment_counts): per-doc Viterbi "
    "token and char counts in one Arrow pass, no shuffle — the "
    "apply-side twin of bpe_doc_token_counts, so the two tokenizer "
    "families' compression is directly comparable on the same corpus",
)
def unigram_doc_token_counts(spark, sf):
    from esgopeta_spark.operators.unigram import unigram_segment_counts, unigram_train

    d = T(spark, sf, "documents")
    vocab = unigram_train(d, vocab_size=200, seed_size=1000, n_iters=3)
    return unigram_segment_counts(d, vocab)


# Shared oracle prelude for the stupid-backoff LM family: trains
# trigram/bigram/unigram counts on the even-id half of the corpus,
# scores every odd-id doc token with full trigram context, aggregates
# per doc (CTE `per_doc`).  Integer milli at every level.
_LM_BACKOFF_CTES = """
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, i AS pos, ws[i] AS w3,
             CASE WHEN i >= 2 THEN ws[i - 1] END AS w2,
             CASE WHEN i >= 3 THEN ws[i - 2] END AS w1
      FROM (SELECT doc_id, string_split(norm, ' ') AS ws
            FROM n WHERE length(norm) > 0),
           UNNEST(range(1, len(ws) + 1)) AS u(i)),
    train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
    scorut AS (SELECT * FROM tok WHERE doc_id % 2 = 1 AND w1 IS NOT NULL),
    tri AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM train WHERE w1 IS NOT NULL
            GROUP BY w1, w2, w3),
    bi AS (SELECT w2, w3, COUNT(*) AS c23 FROM train WHERE w2 IS NOT NULL
           GROUP BY w2, w3),
    uni AS (SELECT w3, COUNT(*) AS c1 FROM train GROUP BY w3),
    tot AS (SELECT SUM(c1) AS n_tokens, COUNT(*) AS v_types FROM uni),
    sc AS (
      SELECT s.doc_id,
             CASE WHEN tri.c3 IS NOT NULL THEN (tri.c3 * 1000) // bctx.c12
                  WHEN bi.c23 IS NOT NULL THEN (400 * ((bi.c23 * 1000) // uctx.c2)) // 1000
                  ELSE (400 * 400 * (((COALESCE(uni.c1, 0) + 1) * 1000)
                        // (tot.n_tokens + tot.v_types))) // 1000000 END AS s,
             CASE WHEN tri.c3 IS NOT NULL THEN 0
                  WHEN bi.c23 IS NOT NULL THEN 1 ELSE 2 END AS lvl
      FROM scorut s
      LEFT JOIN tri ON s.w1 = tri.w1 AND s.w2 = tri.w2 AND s.w3 = tri.w3
      LEFT JOIN (SELECT w2 AS bw1, w3 AS bw2, c23 AS c12 FROM bi) bctx
             ON s.w1 = bctx.bw1 AND s.w2 = bctx.bw2
      LEFT JOIN bi ON s.w2 = bi.w2 AND s.w3 = bi.w3
      LEFT JOIN (SELECT w3 AS uw, c1 AS c2 FROM uni) uctx ON s.w2 = uctx.uw
      LEFT JOIN uni ON s.w3 = uni.w3
      CROSS JOIN tot),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_scored,
             CAST(SUM(s) AS BIGINT) AS score_sum_milli,
             CAST(SUM(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_trigram_hits,
             CAST(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bigram_backoffs,
             CAST(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unigram_backoffs
      FROM sc GROUP BY doc_id)
    """


@register(
    "text_lm_familiarity_backoff",
    "G4,E3,E5",
    _LM_BACKOFF_CTES
    + """
    SELECT doc_id, n_scored, score_sum_milli, n_trigram_hits,
           n_bigram_backoffs, n_unigram_backoffs
    FROM per_doc
    """,
    doc="n-gram LM familiarity scoring with STUPID BACKOFF (Brants et al. "
    "2007; the CCNet-shaped 'does this doc look like the reference "
    "corpus' quality filter, r8): trigram/bigram/unigram counts train on "
    "the even-id half of the corpus, every odd-id doc's tokens (with full "
    "trigram context) score as c3/c12, 0.4*c23/c2, or 0.4^2*add-1-unigram "
    "— in INTEGER MILLI units (a div b at every level; libm ln() "
    "perplexity would flake cross-engine hashes, catalog rule) — and "
    "aggregate per doc with per-backoff-level counts.  Plan: two lag() "
    "windows build the gram stream (no self-join), count tables join by "
    "n-gram key (broadcast here, shuffle for full-corpus LMs), totals as "
    "a deferred 1-row broadcast cross join; operators/text.py "
    "lm_backoff_scores",
)
def text_lm_familiarity_backoff(spark, sf):
    from esgopeta_spark.operators.text import lm_backoff_scores

    d = T(spark, sf, "documents")
    return lm_backoff_scores(
        d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
    )


@register(
    "select_perplexity_buckets",
    "G4,E5",
    _LM_BACKOFF_CTES
    + """
    , mb AS (
      SELECT p.doc_id, d.lang, p.n_scored,
             CAST(p.score_sum_milli // p.n_scored AS BIGINT) AS mean_score_milli
      FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id)
    SELECT doc_id, lang, n_scored, mean_score_milli,
           CAST(NTILE(3) OVER w AS INTEGER) AS ppl_bucket,
           CASE NTILE(3) OVER w WHEN 1 THEN 'head' WHEN 3 THEN 'tail'
                ELSE 'middle' END AS bucket_label
    FROM mb
    WINDOW w AS (PARTITION BY lang ORDER BY mean_score_milli DESC, doc_id ASC)
    """,
    doc="CCNet-style per-language perplexity bucketing (Wenzek et al. "
    "2020): every scored doc lands in the head/middle/tail third of its "
    "language by per-token LM familiarity (ntile over mean DESC, id ASC "
    "— unique total order, rule 4; CCNet ranks perplexity ascending, the "
    "integer-milli familiarity score is the same tiering oriented higher "
    "= better).  Plan: the backoff scoring pipeline + a 2-column lang "
    "dim join + ONE per-language ntile window (no global sort); "
    "operators/selection.py perplexity_buckets",
)
def select_perplexity_buckets(spark, sf):
    from esgopeta_spark.operators.selection import perplexity_buckets

    d = T(spark, sf, "documents")
    return perplexity_buckets(
        d.filter(F.col("doc_id") % 2 == 0), d.filter(F.col("doc_id") % 2 == 1)
    )


@register(
    "quality_k_anonymity",
    "G4,E4,E2",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal) AS BIGINT) // 2000 AS balance_band,
           CAST(COUNT(*) AS BIGINT) AS class_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < 5
    """,
    doc="k-anonymity audit (Sweeney 2002, the release-privacy check a "
    "training-data pipeline runs before publishing per-person tables, "
    "r8): every (nation, market segment, coarse balance band) "
    "equivalence class smaller than k=5 re-identifies its members — one "
    "row per violating class with its size (operators/quality.py "
    "k_anonymity_audit).  Banding is integer-exact (floor to whole "
    "dollars, then integer division; Spark's double->bigint cast and "
    "DuckDB's integer // BOTH truncate toward zero, verified on the "
    "negative-balance rows).  Plan: "
    "one partial-agg shuffle on the quasi tuple, violation filter after "
    "the final aggregate",
)
def quality_k_anonymity(spark, sf):
    from esgopeta_spark.operators.quality import k_anonymity_audit

    c = T(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor("c_acctbal").cast("bigint") / F.lit(2000)).cast("bigint").alias("balance_band"),
    )
    out = k_anonymity_audit(c, ["c_nationkey", "c_mktsegment", "balance_band"], k=5)
    return out.select(
        "c_nationkey", "c_mktsegment", "balance_band",
        F.col("class_size").cast("bigint").alias("class_size"),
    )


@register(
    "dedup_lines_c4",
    "G1,G4,E5",
    r"""
    WITH lined AS (
      SELECT doc_id, regexp_replace(text, '((\S+ ){7}\S+) ', '\1' || chr(10), 'g') AS t
      FROM documents
    ), lines AS (
      SELECT doc_id,
             unnest(string_split(t, chr(10))) AS line,
             generate_subscripts(string_split(t, chr(10)), 1) AS pos
      FROM lined
    ), flagged AS (
      SELECT doc_id, pos, line,
             CASE WHEN line <> ''
                       AND COUNT(*) OVER (PARTITION BY line) >= 2
                       AND ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) > 1
                  THEN 1 ELSE 0 END AS removed
      FROM lines
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN removed = 0 THEN line END, chr(10) ORDER BY pos), '')
             AS clean_text,
           CAST(SUM(1 - removed) AS BIGINT) AS n_kept,
           CAST(SUM(removed) AS BIGINT) AS n_removed
    FROM flagged GROUP BY doc_id
    """,
    doc="corpus-wide line dedup, C4 keep-first semantics (Raffel et al. "
    "2020 §2.2 'discard all but one of any three-sentence span'; CCNet "
    "paragraph dedup, r8): the synthetic corpus has no newlines, so the "
    "entry first injects line structure — a newline after every 8th "
    "word via one regexp_replace both engines run identically (leftmost "
    "non-overlapping, Java $1 == RE2 \\1) — then drops every repeated "
    "occurrence of an exact line corpus-wide, keeping the first in "
    "(doc_id, pos) order, and reassembles the cleaned text per doc.  "
    "String-exact output => hash-exact oracle.  Plan: one shuffle on "
    "the line key (count + row_number share the partitioning), one "
    "groupBy doc_id reassembly — no joins; operators/text.py line_dedup",
)
def dedup_lines_c4(spark, sf):
    from esgopeta_spark.operators.text import line_dedup

    d = T(spark, sf, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"((\S+ ){7}\S+) ", "$1\n").alias("text"),
    )
    return line_dedup(d).select("doc_id", "clean_text", "n_kept", "n_removed")


@register(
    "text_gopher_rules",
    "G4,E2",
    r"""
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      FROM documents
    ), w AS (
      SELECT doc_id, norm,
             CASE WHEN length(norm) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE string_split(norm, ' ') END AS ws
      FROM n
    ), b AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CASE WHEN len(ws) > 0 THEN length(norm) - (len(ws) - 1) ELSE 0 END AS chars,
             CAST(len(regexp_extract_all(norm, '[^ ]*[a-zA-Z][^ ]*')) AS BIGINT) AS alpha,
             CAST(len(list_intersect(list_distinct(ws),
                  ['the','and','of','to','in','is','that','it','for','was'])) AS BIGINT)
               AS stop_hits,
             CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS ng,
             CAST(greatest(len(ws) - 2, 0) AS BIGINT)
               - CAST(len(list_distinct([array_to_string(ws[i : i + 2], ' ')
                                         for i in range(1, len(ws) - 1)])) AS BIGINT) AS dup
      FROM w
    ), m AS (
      SELECT doc_id, n_words, stop_hits,
             CAST(CASE WHEN n_words > 0 THEN (chars * 1000) // n_words ELSE 0 END AS BIGINT)
               AS mwl_milli,
             CAST(CASE WHEN n_words > 0 THEN (alpha * 1000) // n_words ELSE 0 END AS BIGINT)
               AS alpha_milli,
             CAST(CASE WHEN ng > 0 THEN (dup * 1000) // ng ELSE 0 END AS BIGINT) AS dup3_milli
      FROM b
    )
    SELECT doc_id, n_words, mwl_milli, alpha_milli, stop_hits, dup3_milli,
           CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS r_word_count,
           CAST(mwl_milli >= 3000 AND mwl_milli <= 10000 AS INTEGER) AS r_mean_word_len,
           CAST(alpha_milli >= 800 AS INTEGER) AS r_alpha_words,
           CAST(stop_hits >= 1 AS INTEGER) AS r_stopwords,
           CAST(dup3_milli <= 300 AS INTEGER) AS r_repetition,
           CAST(n_words >= 50 AND n_words <= 100000
                AND mwl_milli >= 3000 AND mwl_milli <= 10000
                AND alpha_milli >= 800 AND stop_hits >= 1
                AND dup3_milli <= 300 AS INTEGER) AS keep
    FROM m
    """,
    doc="Gopher quality-rule battery (Rae et al. 2021 §A1.1.2, r8): per "
    "doc the measured stats and one flag per rule — word-count bounds, "
    "mean word length in [3,10], >=80% letter-bearing words, stopword "
    "presence (>=1 here; the corpus vocabulary carries few), duplicate "
    "3-gram fraction <= 30% — plus keep = all pass.  Every ratio is "
    "INTEGER MILLI (a*1000 div b both engines); word chars come from "
    "normalized-length arithmetic, letter words from one regexp_count "
    "(Java == RE2 leftmost non-overlapping; the pattern cannot span the "
    "space separator).  Plan: single codegen projection, no shuffle; "
    "operators/text.py gopher_rules",
)
def text_gopher_rules(spark, sf):
    from esgopeta_spark.operators.text import gopher_rules

    return gopher_rules(T(spark, sf, "documents"), min_stop_hits=1)


@register(
    "multimodal_audio_stats",
    "G5,E2",
    """
    WITH sel AS (
      SELECT doc_id, (doc_id // 10) % 4 AS c
      FROM documents WHERE doc_id % 10 = 9)
    SELECT doc_id AS media_id,
           CAST(4096 AS BIGINT) AS n_samples,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(CASE c WHEN 0 THEN 0 WHEN 1 THEN 134213632
                       WHEN 2 THEN 67108864 ELSE 8386560 END AS BIGINT)
             AS sum_abs,
           CAST(CASE c WHEN 0 THEN 0 WHEN 1 THEN 4397778079744
                       WHEN 2 THEN 1099511627776 ELSE 22898104320 END AS BIGINT)
             AS sum_sq,
           CAST(CASE c WHEN 0 THEN 0 WHEN 1 THEN 32767
                       WHEN 2 THEN 16384 ELSE 4095 END AS BIGINT) AS peak,
           CAST(CASE c WHEN 1 THEN 4096 ELSE 0 END AS BIGINT) AS n_clipped,
           CAST(CASE c WHEN 0 THEN 4096 WHEN 3 THEN 328 ELSE 0 END AS BIGINT)
             AS n_quiet,
           CAST(CASE c WHEN 0 THEN 0 WHEN 1 THEN 32767000
                       WHEN 2 THEN 16384000 ELSE 2047500 END AS BIGINT)
             AS mean_abs_milli
    FROM sel
    """,
    doc="per-clip integer loudness/quality statistics (r9): energy, "
    "peak, hard-clipping and silence counters over the from-scratch "
    "audio decoders.  Per selected doc, render one of 4 planted 4096-"
    "sample mono waveforms (silence, full-scale +/-32767 square = all "
    "clipped, half-scale square, 0..4095 sawtooth) through a REAL WAV "
    "round-trip; WAV PCM16 is lossless and every statistic exact int64, "
    "so the oracle is CLOSED-FORM waveform arithmetic (sum |k| and "
    "sum k^2 over the ramp, full-scale counts).  Plan: one Arrow decode "
    "pass, no shuffle; operators/multimodal.py audio_stats",
)
def multimodal_audio_stats(spark, sf):
    from esgopeta_spark.operators.multimodal import audio_stats
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 9).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        def wave(c):
            if c == 0:
                s = np.zeros(4096, dtype=np.int16)
            elif c == 1:
                s = np.tile(np.array([32767, -32767], dtype=np.int16), 2048)
            elif c == 2:
                s = np.tile(np.array([16384, -16384], dtype=np.int16), 2048)
            else:
                s = np.arange(4096, dtype=np.int16)
            return codecs.encode_wav(s, 8000)

        for pdf in batches:
            ids_, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(wave((d // 10) % 4))
                ids_.append(d)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    return audio_stats(media)


@register(
    "multimodal_image_stats",
    "G5,E2",
    """
    WITH sel AS (
      SELECT doc_id, (doc_id // 10) % 4 AS c
      FROM documents WHERE doc_id % 10 = 7)
    SELECT doc_id AS media_id,
           CAST(32 AS INTEGER) AS width, CAST(24 AS INTEGER) AS height,
           CAST(CASE c WHEN 0 THEN 76800 WHEN 1 THEN 153600
                       ELSE 76800 END AS BIGINT) AS sum_gray,
           CAST(CASE c WHEN 0 THEN 7680000 WHEN 1 THEN 30720000
                       ELSE 15360000 END AS BIGINT) AS sum_gray_sq,
           CAST(CASE c WHEN 2 THEN 148800 ELSE 0 END AS BIGINT) AS edge_h,
           CAST(CASE c WHEN 3 THEN 147200 ELSE 0 END AS BIGINT) AS edge_v,
           CAST(CASE c WHEN 1 THEN 200000 ELSE 100000 END AS BIGINT)
             AS mean_gray_milli
    FROM sel
    """,
    doc="per-image integer quality statistics (r9): brightness (gray "
    "sum), contrast (sum of squares), sharpness (horizontal/vertical "
    "gradient energy) over the from-scratch decoders — the image-corpus "
    "filter signals.  Per selected doc, render one of 4 planted classes "
    "(uniform 100, uniform 200, 0/200 vertical stripes, 0/200 horizontal "
    "stripes) through a REAL PNG encode/decode round-trip; PNG is "
    "lossless and every statistic is exact int64, so the oracle is the "
    "CLOSED-FORM pixel arithmetic (the FLAC-style strong-oracle shape: "
    "value-exact, not class-structural).  32x24: uniform sum=v*768, "
    "stripes half-half sum=200*384, edge_h=24 rows*31 steps*200, "
    "edge_v=32 cols*23 steps*200.  Plan: one Arrow decode pass, no "
    "shuffle; operators/multimodal.py image_stats",
)
def multimodal_image_stats(spark, sf):
    from esgopeta_spark.operators.multimodal import image_stats
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 7).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        def img(c):
            if c == 0:
                g = np.full((24, 32), 100, dtype=np.uint8)
            elif c == 1:
                g = np.full((24, 32), 200, dtype=np.uint8)
            elif c == 2:
                g = np.tile(
                    np.array([0, 200], dtype=np.uint8), 16
                )[None, :].repeat(24, axis=0)
            else:
                g = np.tile(
                    np.array([0, 200], dtype=np.uint8), 12
                )[:, None].repeat(32, axis=1)
            return np.stack([g, g, g], axis=-1)

        for pdf in batches:
            ids_, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(codecs.encode_png(img((d // 10) % 4)))
                ids_.append(d)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    return image_stats(media)


@register(
    "text_c4_rules",
    "G4,E2",
    r"""
    WITH ln AS (
      SELECT doc_id, unnest(string_split(text, chr(10))) AS line
      FROM documents
    ), st AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(line), '\s+', ' ', 'g'))) = 0
                  THEN 0
                  ELSE len(string_split(
                         trim(regexp_replace(lower(line), '\s+', ' ', 'g')), ' '))
             END AS nw,
             CASE WHEN right(rtrim(line), 1) IN ('.', '!', '?', '"')
                  THEN 1 ELSE 0 END AS term,
             CASE WHEN position('javascript' IN lower(line)) > 0
                  THEN 1 ELSE 0 END AS js,
             CASE WHEN position('terms of use' IN lower(line)) > 0
                    OR position('privacy policy' IN lower(line)) > 0
                    OR position('cookie policy' IN lower(line)) > 0
                    OR position('uses cookies' IN lower(line)) > 0
                  THEN 1 ELSE 0 END AS pol,
             CAST(length(line) - length(translate(line, '.!?', '')) AS BIGINT) AS sent,
             CASE WHEN position('lorem ipsum' IN lower(line)) > 0
                  THEN 1 ELSE 0 END AS lor,
             CASE WHEN position('{' IN line) > 0 THEN 1 ELSE 0 END AS br
      FROM ln
    ), agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN term = 1 AND nw >= 5 AND js = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines,
             CAST(sum(sent) AS BIGINT) AS n_sentences,
             CAST(sum(pol) AS BIGINT) AS n_policy_lines,
             CAST(max(lor) AS INTEGER) AS has_lorem_ipsum,
             CAST(max(br) AS INTEGER) AS has_brace
      FROM st GROUP BY doc_id
    )
    SELECT doc_id, n_lines, n_kept_lines, n_sentences, n_policy_lines,
           has_lorem_ipsum, has_brace,
           CAST(CASE WHEN n_sentences >= 3 AND has_lorem_ipsum = 0
                      AND has_brace = 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM agg
    """,
    doc="C4 line/page filter battery (Raffel et al. 2020 §2.2, r9) — the "
    "web-crawl-artifact complement to the Gopher fluency rules: per doc, "
    "kept-line count (terminal punctuation + >=5 words + no "
    "'javascript'), sentence-terminator count (the >=3-sentence page "
    "gate's proxy), policy-boilerplate line count, lorem-ipsum/brace "
    "poison flags, and the C4 page keep verdict.  Every statistic is an "
    "integer count or 0/1 flag; phrase checks are literal substring "
    "positions (no regex dialect crosses the engine boundary).  Plan: "
    "ONE posexplode line split + one doc-keyed aggregate, page markers "
    "OR-folded in the same aggregate (no doc-scalar re-join — single "
    "lineage); operators/text.py c4_rules",
)
def text_c4_rules(spark, sf):
    from esgopeta_spark.operators.text import c4_rules

    return c4_rules(T(spark, sf, "documents"))


@register(
    "split_train_shards",
    "G4,E5",
    r"""
    WITH d AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    ), s AS (
      SELECT doc_id, h,
             CAST(CAST(('0x' || substr(h, 1, 8)) AS UBIGINT) AS BIGINT) AS d1,
             CAST(CAST(('0x' || substr(h, 9, 8)) AS UBIGINT) AS BIGINT) AS d2
      FROM d
    ), a AS (
      SELECT doc_id, h,
             CASE WHEN d1 < 3435973836 THEN 'train'
                  WHEN d1 < 3865470566 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(d2 % 8 AS INTEGER) AS shard
      FROM s
    )
    SELECT doc_id, split, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY split, shard ORDER BY h ASC, doc_id ASC)
                AS BIGINT) AS ordinal
    FROM a
    """,
    doc="deterministic train/val/test split + writer-shard assignment "
    "(the standard hash-split guaranteeing a doc never migrates between "
    "splits as the corpus grows, r8): split from the first 8 md5 hex "
    "chars as an integer draw vs integer cumulative thresholds "
    "(floor(0.8*16^8)=3435973836, floor(0.9*16^8)=3865470566 — no "
    "doubles cross the engine boundary), shard from the NEXT 8 hex "
    "chars mod 8 (independent draw => uniform shards within each "
    "split), ordinal = dense rank within (split, shard) in (md5, id) "
    "order.  Plan: codegen projection + one window shuffle on (split, "
    "shard); operators/text.py split_shards",
)
def split_train_shards(spark, sf):
    from esgopeta_spark.operators.text import split_shards

    return split_shards(T(spark, sf, "documents").select("doc_id"))


@register(
    "pipeline_clean_gate_split",
    "G1,G4,E3,E4",
    r"""
    WITH lined AS (
      SELECT doc_id, regexp_replace(text, '((\S+ ){7}\S+) ', '\1' || chr(10), 'g') AS t
      FROM documents
    ), lines AS (
      SELECT doc_id,
             unnest(string_split(t, chr(10))) AS line,
             generate_subscripts(string_split(t, chr(10)), 1) AS pos
      FROM lined
    ), flagged AS (
      SELECT doc_id, pos, line,
             CASE WHEN line <> ''
                       AND COUNT(*) OVER (PARTITION BY line) >= 2
                       AND ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) > 1
                  THEN 1 ELSE 0 END AS removed
      FROM lines
    ), cleaned AS (
      SELECT doc_id,
             COALESCE(string_agg(CASE WHEN removed = 0 THEN line END, chr(10) ORDER BY pos), '')
               AS clean_text
      FROM flagged GROUP BY doc_id
    ), n AS (
      SELECT doc_id, regexp_replace(lower(trim(clean_text)), '\s+', ' ', 'g') AS norm
      FROM cleaned
    ), w AS (
      SELECT doc_id, norm,
             CASE WHEN length(norm) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE string_split(norm, ' ') END AS ws
      FROM n
    ), b AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CASE WHEN len(ws) > 0 THEN length(norm) - (len(ws) - 1) ELSE 0 END AS chars,
             CAST(len(regexp_extract_all(norm, '[^ ]*[a-zA-Z][^ ]*')) AS BIGINT) AS alpha,
             CAST(len(list_intersect(list_distinct(ws),
                  ['the','and','of','to','in','is','that','it','for','was'])) AS BIGINT)
               AS stop_hits,
             CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS ng,
             CAST(greatest(len(ws) - 2, 0) AS BIGINT)
               - CAST(len(list_distinct([array_to_string(ws[i : i + 2], ' ')
                                         for i in range(1, len(ws) - 1)])) AS BIGINT) AS dup
      FROM w
    ), m AS (
      SELECT doc_id, n_words, stop_hits,
             CAST(CASE WHEN n_words > 0 THEN (chars * 1000) // n_words ELSE 0 END AS BIGINT)
               AS mwl_milli,
             CAST(CASE WHEN n_words > 0 THEN (alpha * 1000) // n_words ELSE 0 END AS BIGINT)
               AS alpha_milli,
             CAST(CASE WHEN ng > 0 THEN (dup * 1000) // ng ELSE 0 END AS BIGINT) AS dup3_milli
      FROM b
    ), kept AS (
      SELECT doc_id, n_words FROM m
      WHERE n_words >= 50 AND n_words <= 100000
        AND mwl_milli >= 3000 AND mwl_milli <= 10000
        AND alpha_milli >= 800 AND stop_hits >= 1 AND dup3_milli <= 300
    ), assigned AS (
      SELECT k.doc_id, k.n_words,
             CASE WHEN CAST(CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) AS BIGINT) < 3435973836 THEN 'train'
                  WHEN CAST(CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) AS BIGINT) < 3865470566 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(CAST(CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 9, 8))
                  AS UBIGINT) AS BIGINT) % 8 AS INTEGER) AS shard
      FROM kept k
    )
    SELECT split, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS sum_words
    FROM assigned GROUP BY split, shard
    """,
    doc="end-to-end training-data prep tail in ONE Catalyst plan (late "
    "r8): corpus-wide C4 line dedup -> Gopher rule gate (keep only) -> "
    "deterministic split/shard assignment -> per (split, shard) doc and "
    "word rollup.  Composes the three late-r8 operators exactly as a "
    "real pipeline would, proving they fuse: the dedup window, the gate "
    "projection, the md5 split, and the final partial-agg all plan "
    "together with no collect between stages.  Plan: line-key window "
    "shuffle -> reassembly groupBy -> codegen gate + split projection (single lineage, no self-join) "
    "-> one final shuffle on (split, shard); operators/text.py "
    "line_dedup + gopher_rules + split_shards",
)
def pipeline_clean_gate_split(spark, sf):
    from esgopeta_spark.operators.text import gopher_rules, line_dedup, split_shards

    d = T(spark, sf, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"((\S+ ){7}\S+) ", "$1\n").alias("text"),
    )
    cleaned = line_dedup(d).select("doc_id", F.col("clean_text").alias("text"))
    gated = gopher_rules(cleaned, min_stop_hits=1).filter(F.col("keep") == 1)
    # split_shards passes n_words through, so the rollup needs no join
    # back on doc_id (a join would recompute the dedup+gate lineage on
    # both sides; measured 2.6x the single-lineage plan at sf0.1)
    sharded = split_shards(gated.select("doc_id", "n_words"))
    return sharded.groupBy("split", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("sum_words"),
    )


@register(
    "multimodal_decode_flac",
    "G5",
    """
    WITH sel AS (
      SELECT doc_id, 4000 + (doc_id % 4) * 1000 AS n, doc_id % 2 = 0 AS stereo
      FROM documents WHERE doc_id % 20 = 9
    ), sums AS (
      SELECT doc_id, n, stereo,
             sum(((doc_id * 7919 + i * 104729) % 30000) - 15000) AS s1,
             sum(((doc_id * 104729 + i * 7919) % 30000) - 15000) AS s2
      FROM sel JOIN (SELECT range AS i FROM range(0, 8000)) t ON i < n
      GROUP BY doc_id, n, stereo
    )
    SELECT doc_id,
           CAST(CASE WHEN stereo THEN 2 ELSE 1 END AS INTEGER) AS channels,
           CAST(n AS BIGINT) AS n_samples,
           CAST(s1 + CASE WHEN stereo THEN s2 ELSE 0 END AS BIGINT) AS sample_sum,
           TRUE AS lossless_ok
    FROM sums
    """,
    doc="REAL FLAC lossless round trip with an EXACT-VALUE oracle: per "
    "selected doc, synthesize a deterministic integer signal "
    "s1(i) = ((id*7919 + i*104729) %% 30000) - 15000 (plus a swapped-"
    "constant channel 2 on even ids), encode to FLAC (operators/flac.py: "
    "stereo-mode/bps/block-size/Rice2/LPC all cycled by id so every "
    "decoder path is exercised), decode back, and emit the decoded "
    "sample SUM — which the oracle recomputes in closed form over a "
    "range() series WITHOUT any codec, because lossless decode must "
    "reproduce the samples bit-for-bit (the strongest oracle shape any "
    "media entry has: value-exact, not just structural).  lossless_ok "
    "pins bit-equality with the source signal Spark-side.  Plan: pruned "
    "1-column scan -> widened partitions -> one Arrow mapInPandas "
    "kernel, no shuffle, no collect",
)
def multimodal_decode_flac(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 20 == 9).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = (
        "doc_id bigint, channels int, n_samples bigint, sample_sum bigint, "
        "lossless_ok boolean"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 4000 + (d % 4) * 1000
                i = np.arange(n, dtype=np.int64)
                s1 = (d * 7919 + i * 104729) % 30000 - 15000
                stereo = d % 2 == 0
                if stereo:
                    s2 = (d * 104729 + i * 7919) % 30000 - 15000
                    sig = np.stack([s1, s2], axis=1).astype(np.int32)
                else:
                    sig = s1[:, None].astype(np.int32)
                mode = ("auto", "independent", "ls", "rs", "ms")[d % 5]
                blob = codecs.encode_flac(
                    sig,
                    sample_rate=(8000, 44100, 12345)[d % 3],
                    bps=(16, 24)[(d // 20) % 2],
                    block_size=(4096, 1000, 192)[(d // 40) % 3],
                    stereo_mode=mode if stereo else "independent",
                    use_lpc=(d // 60) % 2 == 0,
                    rice2=(d // 80) % 2 == 1,
                )
                dec, sr, bps = codecs.decode_flac(blob)
                out.append(
                    dict(
                        doc_id=d,
                        channels=dec.shape[1],
                        n_samples=dec.shape[0],
                        sample_sum=int(dec.astype(np.int64).sum()),
                        lossless_ok=bool(
                            np.array_equal(dec.astype(np.int64), sig.astype(np.int64))
                        ),
                    )
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(kernel, out_schema)


@register(
    "multimodal_audio_vad",
    "G5,E2",
    """
    WITH sel AS (
      SELECT doc_id,
             3 + (doc_id // 10) % 5 AS a,
             2 + (doc_id // 7) % 3 AS b,
             CASE WHEN (doc_id // 10) % 2 = 0 THEN 3 ELSE 0 END AS d,
             CASE WHEN (doc_id // 10) % 6 = 5 THEN 1 ELSE 0 END AS poison
      FROM documents WHERE doc_id % 10 = 4)
    SELECT doc_id AS media_id,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE a + b + 4 + d + 2 END AS BIGINT)
        AS n_frames,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE b + d END AS BIGINT) AS n_active,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN d > 0 THEN 2 ELSE 1 END
           AS BIGINT) AS n_segments,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE a END AS BIGINT) AS first_active,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN d > 0 THEN a + b + 4 + d - 1
                ELSE a + b - 1 END AS BIGINT) AS last_active,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE a END AS BIGINT) AS lead_silence,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN d > 0 THEN 2 ELSE 6 END
           AS BIGINT) AS tail_silence
    FROM sel
    """,
    doc="voice-activity SEGMENTATION (r12 — the speech-corpus "
    "trimmer/segmenter; audio_stats counts quiet samples, this finds "
    "the quiet STRUCTURE): fixed 512-sample frames, integer "
    "mean-|sample| threshold, segments = maximal active runs; lead/"
    "tail silence = the frames a pipeline cuts before paying storage "
    "and training tokens for dead air.  Per selected doc, render "
    "silence(a) tone(b) silence(4) [tone(3)] silence(2) frame spans "
    "(span lengths doc_id arithmetic) through a REAL WAV round-trip; "
    "PCM16 is lossless and every output exact int64, so the oracle is "
    "closed-form span arithmetic.  One (doc_id//10)%6==5 class ships "
    "a poison payload and must surface as the VISIBLE all--1 marker "
    "row, never a silent drop.  Plan: one Arrow decode pass, "
    "kernel-local segmentation, no shuffle; "
    "operators/multimodal.py audio_vad_segments",
)
def multimodal_audio_vad(spark, sf):
    from esgopeta_spark.operators.multimodal import audio_vad_segments
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 4).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        FR = 512

        def clip(did):
            if (did // 10) % 6 == 5:
                return b"not audio at all"  # the visible-marker class
            a = 3 + (did // 10) % 5
            b = 2 + (did // 7) % 3
            d = 3 if (did // 10) % 2 == 0 else 0
            spans = [(a, 0), (b, 8000), (4, 0), (d, 8000), (2, 0)]
            s = np.concatenate(
                [np.full(n * FR, amp, dtype=np.int16) for n, amp in spans]
            )
            return codecs.encode_wav(s, 8000)

        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                payloads.append(clip(did))
                ids_.append(did)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    return audio_vad_segments(media)


@register(
    "multimodal_image_blur",
    "G5,E2",
    """
    WITH sel AS (
      SELECT doc_id, (doc_id // 10) % 4 AS c,
             10 + doc_id % 7 AS k,
             5 + doc_id % 11 AS m,
             CASE WHEN doc_id % 50 = 6 THEN 1 ELSE 0 END AS poison
      FROM documents WHERE doc_id % 10 = 6)
    SELECT doc_id AS media_id,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE 16 END AS INTEGER) AS width,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE 12 END AS INTEGER) AS height,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE 140 END AS BIGINT) AS n_interior,
      CAST(CASE WHEN poison = 1 THEN -1
                WHEN c = 1 THEN 80 * k
                WHEN c = 3 THEN 2240 * m
                ELSE 0 END AS BIGINT) AS lap_l1,
      CAST(CASE WHEN poison = 1 THEN -1
                WHEN c = 1 THEN 80 * k
                WHEN c = 2 THEN 5600
                ELSE 0 END AS BIGINT) AS grad_l1,
      CAST(CASE WHEN poison = 1 THEN -1
                WHEN c = 1 THEN (80 * k * 1000) // 140
                WHEN c = 3 THEN 16000 * m
                ELSE 0 END AS BIGINT) AS lap_mean_milli
    FROM sel
    """,
    doc="Laplacian blur detection (r12 — the LAION-style low-detail "
    "image cut; image_stats' first-derivative edge energy cannot tell "
    "a smooth ramp from a true edge, the second derivative can): per "
    "selected doc, render one of 4 planted 16x12 patterns through a "
    "REAL PNG round-trip — constant (lap 0, grad 0), vertical step of "
    "id-derived height (lap = grad = 80k), LINEAR RAMP (grad 5600 but "
    "lap EXACTLY 0 — the separating case), checkerboard of id-derived "
    "amplitude (lap 2240m, centered grad EXACTLY 0).  PNG is lossless "
    "and every statistic exact int64, so the oracle is closed-form "
    "pattern arithmetic; doc_id%50==6 ships poison and must surface "
    "as the visible all--1 marker row.  Plan: one Arrow decode pass, "
    "no shuffle; operators/multimodal.py image_blur_stats",
)
def multimodal_image_blur(spark, sf):
    from esgopeta_spark.operators.multimodal import image_blur_stats
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 6).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        W, H = 16, 12

        def img(did):
            if did % 50 == 6:
                return b"not an image"
            c = (did // 10) % 4
            k = 10 + did % 7
            m = 5 + did % 11
            v = np.zeros((H, W), dtype=np.int64)
            if c == 0:
                v[:] = 100
            elif c == 1:
                v[:, :8] = 60
                v[:, 8:] = 60 + k
            elif c == 2:
                v[:] = 40 + 5 * np.arange(W)[None, :]
            else:
                v[:] = 30
                rr, cc = np.indices((H, W))
                v[(rr + cc) % 2 == 1] = 30 + m
            rgb = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
            return codecs.encode_png(rgb)

        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                payloads.append(img(did))
                ids_.append(did)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    return image_blur_stats(media)


@register(
    "multimodal_audio_profile",
    "G5,E2",
    """
    WITH sel AS (
      SELECT doc_id,
             3 + (doc_id // 10) % 5 AS a,
             2 + (doc_id // 7) % 3 AS b,
             CASE WHEN (doc_id // 10) % 2 = 0 THEN 3 ELSE 0 END AS d,
             CASE WHEN (doc_id // 10) % 6 = 5 THEN 1 ELSE 0 END AS poison
      FROM documents WHERE doc_id % 10 = 4),
    f AS (SELECT doc_id, a, b, d, poison, a + b + 4 + d + 2 AS nf FROM sel)
    SELECT doc_id AS media_id,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE nf * 512 END AS BIGINT)
        AS n_samples,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE 8000 END AS INTEGER)
        AS sample_rate,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE (b + d) * 512 * 8000 END
           AS BIGINT) AS sum_abs,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE 8000 END AS BIGINT) AS peak,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE 0 END AS BIGINT) AS n_clipped,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE (nf - b - d) * 512 END
           AS BIGINT) AS n_quiet,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE nf END AS BIGINT) AS n_frames,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE b + d END AS BIGINT) AS n_active,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN d > 0 THEN 2 ELSE 1 END
           AS BIGINT) AS n_segments,
      CAST(CASE WHEN poison = 1 THEN -1 ELSE a END AS BIGINT) AS lead_silence,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN d > 0 THEN 2 ELSE 6 END
           AS BIGINT) AS tail_silence
    FROM f
    """,
    doc="decode-ONCE audio curation profile (r12): every per-clip "
    "curation signal — the audio_stats loudness/clipping/quiet battery "
    "AND the VAD segment structure — from one decode pass (the codec "
    "dominates media cost; the separate ops decode twice; math "
    "identical line-for-line, pinned).  Same planted span fixture as "
    "multimodal_audio_vad, so the oracle is the combined closed form "
    "(sample rate 8000, constant 8000-amplitude tones, silence exact); "
    "poison class surfaces as the visible all--1 marker row.  Plan: "
    "one Arrow decode pass, no shuffle; "
    "operators/multimodal.py audio_curation_profile",
)
def multimodal_audio_profile(spark, sf):
    from esgopeta_spark.operators.multimodal import audio_curation_profile
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(F.col("doc_id") % 10 == 4).select("doc_id")
    ids = ensure_min_partitions(ids)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        FR = 512

        def clip(did):
            if (did // 10) % 6 == 5:
                return b"not audio at all"
            a = 3 + (did // 10) % 5
            b = 2 + (did // 7) % 3
            d = 3 if (did // 10) % 2 == 0 else 0
            spans = [(a, 0), (b, 8000), (4, 0), (d, 8000), (2, 0)]
            s = np.concatenate(
                [np.full(n * FR, amp, dtype=np.int16) for n, amp in spans]
            )
            return codecs.encode_wav(s, 8000)

        for pdf in batches:
            ids_, payloads = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                payloads.append(clip(did))
                ids_.append(did)
            yield pd.DataFrame({"media_id": pd.Series(ids_, dtype="int64"),
                                "payload": payloads})

    media = ids.mapInPandas(render, "media_id bigint, payload binary")
    return audio_curation_profile(media)


@register(
    "multimodal_alignment_gate",
    "G5,G3",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    p AS (
      SELECT a.vec_id AS cap_id,
             CASE WHEN a.vec_id % 3 = 0 THEN a.vec_id
                  ELSE a.vec_id + 1 END AS img_id,
             a.v AS va
      FROM e a),
    j AS (
      SELECT p.cap_id, p.img_id,
             list_dot_product(p.va, b.v)
               / (sqrt(list_dot_product(p.va, p.va))
                  * sqrt(list_dot_product(b.v, b.v))) AS cs
      FROM p JOIN e b ON p.img_id = b.vec_id)
    SELECT cap_id, img_id,
           CAST(floor(cs * 1000000 + 0.5) AS BIGINT) AS cos_micro,
           CAST(CASE WHEN floor(cs * 1000000 + 0.5) >= 900000
                     THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM j
    """,
    doc="cross-modal alignment gate (r12 — the CLIP-score-shaped "
    "filter of LAION-style curation: a caption-image pair survives "
    "only when the two embeddings agree): exact integer micro cosine "
    "per pair + keep verdict at 0.9.  Fixture pairs every vector with "
    "itself (vec_id%3==0 — the aligned class, cos_micro exactly 1e6) "
    "or its neighbor (the misaligned class, near-zero on random "
    "vectors); ONE vec_id-equi join builds the pairs, the gate itself "
    "is a codegen projection (sequential-IEEE unrolled dot — the "
    "proven cross-engine idiom).  "
    "operators/similarity.py embedding_alignment_gate",
)
def multimodal_alignment_gate(spark, sf):
    from esgopeta_spark.operators.similarity import embedding_alignment_gate

    e = T(spark, sf, "embeddings").select("vec_id", "embedding")
    vid = F.col("vec_id")
    p = e.select(
        vid.alias("cap_id"),
        F.when(vid % 3 == 0, vid).otherwise(vid + 1).alias("img_id"),
        F.col("embedding").alias("cap_vec"),
    )
    pairs = p.join(
        e.select(vid.alias("img_id"), F.col("embedding").alias("img_vec")),
        "img_id",
    )
    return embedding_alignment_gate(
        pairs, "cap_vec", "img_vec", dim=64, threshold_micro=900_000
    ).select("cap_id", "img_id", "cos_micro", "keep")


@register(
    "multimodal_decode_mpeg1_video",
    "G5",
    """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1
                WHEN doc_id % 3 = 0 THEN 64 WHEN doc_id % 3 = 1 THEN 48
                ELSE 32 END AS INTEGER) AS width,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1
                WHEN doc_id % 3 = 0 THEN 32 WHEN doc_id % 3 = 1 THEN 48
                ELSE 64 END AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1
                ELSE 1 + doc_id % 5 END AS INTEGER) AS rate_code,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1
                ELSE 4 + doc_id % 3 END AS INTEGER) AS n_frames,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1
                WHEN doc_id % 4 = 1 THEN 0 ELSE 1 END AS INTEGER) AS n_cuts,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1
                WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INTEGER)
                AS n_skipped,
           CAST(doc_id % 23 <> 1 AS BOOLEAN) AS fidelity_ok
    FROM documents WHERE doc_id % 20 = 3
    """,
    doc="REAL MPEG-1 VIDEO (ISO 11172-2) intra round trip, r14 (r13 "
    "verdict #3 — the video stack's first real inter-frame-capable "
    "codec; MJPEG/GIF stay beside it): per selected doc, synthesize a "
    "deterministic intra-only clip (geometry/rate/length/quantizer by "
    "residue class; a designed luminance-ramp SCENE CUT unless id%4==1; "
    "id%7==0 adds B.1 macroblock stuffing; id%5==0 injects a P-picture "
    "header the decoder must COUNT and skip), encode through the "
    "from-scratch encoder twin (operators/mpeg1_video.py — B.1/B.2a/"
    "B.5a/B.5b VLCs, short run/level table + 6-bit escapes, MPEG-1 "
    "dequant oddification, one slice per MB row, flat-DC 4:2:0 "
    "chroma), decode back and emit the structural facts plus dHash "
    "scene-cut count (within-scene drift <= 2 bits, cut >= 40 bits — "
    "class-separation pinned at the sf0.1 id range in tests/"
    "test_mpeg1_video.py) and a >30 dB PSNR flag the oracle asserts "
    "TRUE.  id%23==1 ships a header-truncated stream that must "
    "quarantine to the visible all--1 row.  Plan: pruned 1-column scan "
    "-> widened partitions -> one Arrow mapInPandas kernel, no "
    "shuffle, no collect; stateless (streams as-is)",
)
def multimodal_decode_mpeg1_video(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(
        F.col("doc_id") % 20 == 3).select("doc_id")
    ids = ensure_min_partitions(ids)
    out_schema = (
        "doc_id bigint, width int, height int, rate_code int, "
        "n_frames int, n_cuts int, n_skipped int, fidelity_ok boolean"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs
        from esgopeta_spark.operators.mpeg1_video import synth_fixture
        from esgopeta_spark.operators.multimodal import dhash64

        mask = (1 << 64) - 1
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                fx = synth_fixture(d)
                payload = fx["payload"]
                if d % 23 == 1:
                    payload = payload[:9]  # header-truncated poison
                try:
                    from esgopeta_spark.operators.mpeg1_video import (
                        decode_mpeg1_video,
                    )

                    dec = decode_mpeg1_video(payload)
                except ValueError:
                    out.append(dict(
                        doc_id=d, width=-1, height=-1, rate_code=-1,
                        n_frames=-1, n_cuts=-1, n_skipped=-1,
                        fidelity_ok=False))
                    continue
                hs = [dhash64(np.stack([fr] * 3, axis=-1))
                      for fr in dec["frames"]]
                n_cuts = sum(
                    1 for a, b in zip(hs, hs[1:])
                    if bin((a ^ b) & mask).count("1") > 8)
                psnr_min = 1e9
                for a, b in zip(fx["frames"], dec["frames"]):
                    err = a.astype(np.float64) - b.astype(np.float64)
                    mse = max(float((err * err).mean()), 1e-12)
                    psnr_min = min(
                        psnr_min, 10 * np.log10(255.0 ** 2 / mse))
                out.append(dict(
                    doc_id=d, width=dec["width"], height=dec["height"],
                    rate_code=dec["rate_code"],
                    n_frames=len(dec["frames"]), n_cuts=n_cuts,
                    n_skipped=dec["n_skipped"],
                    fidelity_ok=bool(psnr_min > 30.0)))
            yield pd.DataFrame(out)

    return ids.mapInPandas(kernel, out_schema)


@register(
    "multimodal_video_keyframes",
    "G5,E5",
    """
    SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx,
           CAST(0 AS BIGINT) AS scene_idx
    FROM documents WHERE doc_id % 20 = 3 AND doc_id % 23 <> 1
    UNION ALL
    SELECT doc_id, CAST(2 + doc_id % 2 AS INTEGER) AS frame_idx,
           CAST(1 AS BIGINT) AS scene_idx
    FROM documents
    WHERE doc_id % 20 = 3 AND doc_id % 23 <> 1 AND doc_id % 4 <> 1
    """,
    doc="scene-representative KEYFRAME selection over the MPEG-1 "
    "fixtures (r14 — the video training pipeline's frame-sampling "
    "step: one frame per scene beats uniform sampling): the same "
    "encoder-twin clips as multimodal_decode_mpeg1_video decode "
    "through the real intra codec, hash through the shared "
    "video_frame_hashes Arrow pass, and multimodal.video_keyframes "
    "picks frame 0 plus every scene-opening frame via the lag-dHash "
    "window.  The oracle derives the keyframe set in closed form from "
    "the fixture's scene design (frame 0 always; frame 2+id%2 exactly "
    "when the cut exists) — resting on the class-separation margins "
    "pinned at the sf0.1 id range in tests/test_mpeg1_video.py.  "
    "Poison docs (id%23==1, truncated header) decode to nothing and "
    "are absent by construction on both sides (their quarantine "
    "VISIBILITY is graded by the decode entry).  Plan: two Arrow "
    "kernels (synth, decode+hash) over one pruned scan, ONE bounded "
    "per-video lag window (frames <= 8, no skew), no joins",
)
def multimodal_video_keyframes(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    ids = T(spark, sf, "documents").filter(
        F.col("doc_id") % 20 == 3).select("doc_id")
    ids = ensure_min_partitions(ids)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgopeta_spark.operators.mpeg1_video import synth_fixture

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                fx = synth_fixture(d)
                payload = fx["payload"]
                if d % 23 == 1:
                    payload = payload[:9]
                out.append(dict(media_id=d, payload=payload))
            yield pd.DataFrame(out)

    media = ids.mapInPandas(synth, "media_id bigint, payload binary")
    from esgopeta_spark.operators.multimodal import video_keyframes

    kf = video_keyframes(media)
    return kf.select(
        F.col("media_id").alias("doc_id"), "frame_idx", "scene_idx")
