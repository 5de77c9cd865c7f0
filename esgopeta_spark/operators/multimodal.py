"""Multimodal column plumbing (SURVEY.md §2 G5).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside; heavy per-item work (decode, resize,
feature-extract, frame-sample) runs in Arrow-batched ``mapInPandas`` so
executors stream record batches without materializing a partition.

Decode status by format:

- **REAL decode, no external deps** (operators.codecs + operators.jpeg,
  pure struct+numpy+stdlib): BMP 24-bit, PPM P6, WAV PCM16, baseline
  PNG (zlib inflate, all five scanline filters), and baseline JPEG
  (SOF0, 4:4:4/4:2:2/4:2:0 sampling, restart markers) — every IMAGE
  format a real corpus ships — through ``decode_media``,
  ``extract_image_features``, ``extract_audio_features`` and
  ``resize_media``, verified by round-trip tests (tests/test_codecs.py).
- **Compressed audio/video containers** (mp3/mp4): container METADATA
  (duration/dims/rates) parses for real with no codec library
  (codecs.parse_mp4_meta / parse_mp3_meta), and mp4 video FRAMES decode
  for real for the Motion-JPEG subset (``sample_video_frames`` slices
  the sample tables and runs each sample through the from-scratch JPEG
  codec).  MPEG-1 audio decodes for REAL: Layers I/II as of r6, Layer
  III (mp3 proper) as of r8, MIXED blocks as of r9 — side info, bit
  reservoir, scalefactors, Huffman regions, requantization, antialias,
  hybrid IMDCT with all four window types, MS joint stereo
  (operators/mpeg1_audio.py — spec-shaped bitstream, documented
  MDCT-filterbank and large-Huffman-table deviations: this module's OWN
  streams round-trip bit-true, but a third-party mp3 selecting the
  large tables needs literal Table B.7 data injected via
  mpeg1_audio.load_spec_tables — see huffman_provenance()),
  including INTENSITY joint stereo for all three layers
  (Layer I/II: shared sample stream + per-channel scalefactors above the
  mode_extension subband bound; Layer III: per-band is_pos ratio split
  with the is_pos=7 escape, composable with MS); only h264/hevc frames
  genuinely require codecs this container does not ship; those rows
  surface ``ok=false, err='needs-codec'``.  (The r1-era
  header-sniff stub kernels were retired in r9 — every format they
  sniffed now has a real decoder behind ``decode_media``.)

Malformed payloads NEVER kill a stage: every kernel catches the codec's
ValueError and quarantines (or skips) the row — at 100 TB a single
poison byte-string must cost one row, not the job.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

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


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode timestamps to sample without
    decoding (``sample_video_frames`` does the real per-sample decode).
    Shows the partitioning story: one row per (video, frame_ts),
    repartitionable by media_id for codec locality."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms")
    )


# ---------------------------------------------------------------------------
# REAL decode path — uncompressed formats via operators.codecs
# ---------------------------------------------------------------------------


def synthetic_media_real(spark, n: int = 64) -> DataFrame:
    """Deterministic corpus of REAL media payloads: BMP, PPM, PNG, JPEG
    and GIF images with a seeded gradient pattern (PNG rows cycle through
    all five scanline filters; JPEG rows alternate 4:4:4 / 4:2:0; GIF
    rows use a 16-color palette pattern), WAV sine tones (every third
    audio row instead carries REAL MPEG-1 Layer I/II frames, r6), plus
    MP4-header rows to exercise the needs-codec path."""
    import numpy as np

    from esgopeta_spark.operators import codecs

    rows = []
    for i in range(n):
        kind = ("image", "image", "audio", "video")[i % 4]
        if kind == "image":
            w, h = 16 + (i % 5) * 4, 12 + (i % 3) * 4
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack(
                [(xx * 7 + i) % 256, (yy * 5 + 2 * i) % 256, (xx + yy + 3 * i) % 256], axis=-1
            ).astype(np.uint8)
            # decorrelate from the kind selector: kind fixes i % 4, so the
            # format index must vary through i // 4 alone or image rows
            # collapse onto two formats
            fmt = ("bmp", "ppm", "png", "jpeg", "gif")[(i // 4 + i % 4) % 5]
            if fmt == "bmp":
                payload = codecs.encode_bmp(arr)
            elif fmt == "ppm":
                payload = codecs.encode_ppm(arr)
            elif fmt == "png":
                payload = codecs.encode_png(arr, filter_type=i % 5)
            elif fmt == "gif":
                # palette format: regenerate the pattern from a 16-color table
                # (the gradient above can exceed GIF's 256-color ceiling)
                pal = np.stack(
                    [(np.arange(16) * 17) % 256, (np.arange(16) * 31) % 256, (np.arange(16) * 7 + i) % 256],
                    axis=-1,
                ).astype(np.uint8)
                arr = pal[(xx + yy + i) % 16]
                payload = codecs.encode_gif(arr)
            else:
                payload = codecs.encode_jpeg(arr, quality=90, subsample=i % 8 >= 4)
            rows.append((i, "image", payload, (w, h, None, None, fmt)))
        elif kind == "audio":
            if i % 3 == 2:  # COMPRESSED audio: real MPEG-1 Layer I/II frames
                sr = 32000
                # compressed-audio rows satisfy i ≡ 2 (mod 12), so i%4 and
                # i%6 are CONSTANT here — derive all variation from i // 12
                j = i // 12
                layer = 1 if j % 2 == 0 else 2
                spf = 384 if layer == 1 else 1152
                n_frames = 1 + j % 4
                t = np.arange(spf * n_frames) / sr
                # 250 Hz multiples give an INTEGER cycle count over both
                # layers' frame sizes (384n/1152n @ 32 kHz), so the clip ends
                # on a zero crossing and leakage doesn't smear the spectrum
                freq = 250.0 * (1 + j % 6)
                samples = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
                payload = codecs.encode_mpeg1_audio(samples, sr, layer=layer)
                rows.append(
                    (i, "audio", payload, (None, None, sr, len(samples) * 1000 // sr, "mp2"))
                )
            else:
                sr = 8000
                dur_s = 0.05 + (i % 4) * 0.025
                t = np.arange(int(sr * dur_s)) / sr
                freq = 200.0 + 50.0 * (i % 8)
                samples = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
                payload = codecs.encode_wav(samples, sr)
                rows.append((i, "audio", payload, (None, None, sr, int(dur_s * 1000), "wav")))
        else:  # compressed video: structurally-valid mp4 with REAL metadata
            # (moov/mvhd duration, tkhd dims on even rows); frame decode
            # still resolves to needs-codec — only the metadata is real
            dur = 1000 + (i % 5) * 500
            vw, vh = (320, 240) if i % 2 == 0 else (None, None)
            payload = codecs.encode_mp4_stub(dur, vw, vh)
            rows.append((i, "video", payload, (vw, vh, None, dur, "mp4")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DECODED_SCHEMA = (
    "media_id bigint, format string, ok boolean, err string, "
    "width int, height int, sample_rate int, n_samples int, duration_ms int"
)


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode of bmp/ppm/png/jpeg/gif/tiff image and wav/mpeg-audio
    payloads per Arrow batch; formats needing an external codec
    (h264/hevc video samples) surface ok=false, err='needs-codec'
    instead of failing the job (at 100 TB a poison payload must never
    kill the stage)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgopeta_spark.operators import codecs

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                fmt = codecs.sniff_format(b)
                rec = dict(
                    media_id=mid, format=fmt, ok=False, err=None,
                    width=None, height=None, sample_rate=None, n_samples=None, duration_ms=None,
                )
                try:
                    if fmt in ("bmp", "ppm", "png", "jpeg", "gif", "tiff"):
                        arr = {
                            "bmp": codecs.decode_bmp,
                            "ppm": codecs.decode_ppm,
                            "png": codecs.decode_png,
                            "jpeg": codecs.decode_jpeg,
                            "gif": codecs.decode_gif,
                            "tiff": codecs.decode_tiff,
                        }[fmt](b)
                        rec.update(ok=True, width=arr.shape[1], height=arr.shape[0])
                    elif fmt == "wav":
                        samples, sr, nch = codecs.decode_wav(b)
                        rec.update(
                            ok=True, sample_rate=sr, n_samples=len(samples) // nch,
                            duration_ms=int(1000 * len(samples) / (sr * nch)),
                        )
                    elif fmt == "flac":
                        arr, sr, _bps = codecs.decode_flac(b)
                        rec.update(
                            ok=True, sample_rate=sr, n_samples=arr.shape[0],
                            duration_ms=arr.shape[0] * 1000 // sr,
                        )
                    elif fmt == "mp4":
                        # container METADATA is parseable without any codec:
                        # box walk pulls duration + track dims; only frame
                        # decode stays guarded
                        meta = codecs.parse_mp4_meta(b)
                        rec.update(
                            err="needs-codec",
                            duration_ms=meta["duration_ms"],
                            width=meta["width"], height=meta["height"],
                        )
                    elif fmt == "mp3":
                        try:  # Layer I/II/III: REAL sample decode
                            pcm, sr = codecs.decode_mpeg1_audio(b)
                            rec.update(
                                ok=True, sample_rate=sr, n_samples=len(pcm),
                                duration_ms=len(pcm) * 1000 // sr,
                            )
                        except ValueError:
                            # stream this decoder can't carry (malformed
                            # frames; every MPEG-1 audio mode decodes as
                            # of r8): metadata-only
                            meta = codecs.parse_mp3_meta(b)
                            rec.update(
                                err="needs-codec",
                                sample_rate=meta["sample_rate"],
                                duration_ms=meta["duration_ms"],
                            )
                    else:
                        rec.update(err=f"undecodable:{fmt}")
                except ValueError as exc:  # malformed payload: quarantine, don't crash
                    rec.update(err=f"corrupt:{exc}")
                out.append(rec)
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, DECODED_SCHEMA)


def extract_image_features(df: DataFrame) -> DataFrame:
    """Real pixel statistics from decoded images: per-channel means, luma
    mean/std, edge energy (mean abs horizontal gradient) — the classic
    cheap quality signals a filtering pipeline thresholds on."""
    out_schema = "media_id bigint, feature array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            ids, feats = [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                fmt = codecs.sniff_format(b)
                if fmt not in ("bmp", "ppm", "png", "jpeg", "gif"):
                    continue
                try:
                    arr = {
                        "bmp": codecs.decode_bmp,
                        "ppm": codecs.decode_ppm,
                        "png": codecs.decode_png,
                        "jpeg": codecs.decode_jpeg,
                        "gif": codecs.decode_gif,
                    }[fmt](b)
                except ValueError:  # corrupt payload: quarantine, don't crash
                    continue
                arr = codecs.to_rgb(arr).astype(np.float64)
                luma = arr @ np.array([0.299, 0.587, 0.114])
                grad = np.abs(np.diff(luma, axis=1)).mean() if luma.shape[1] > 1 else 0.0
                feats.append(
                    np.array(
                        [arr[..., 0].mean(), arr[..., 1].mean(), arr[..., 2].mean(),
                         luma.mean(), luma.std(), grad],
                        dtype=np.float32,
                    ).tolist()
                )
                ids.append(mid)
            # explicit dtypes: an all-empty batch (no image rows in this
            # partition) must still carry int64/object columns for Arrow
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "feature": pd.Series(feats, dtype=object),
                }
            )

    return df.mapInPandas(kernel, out_schema)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Real signal statistics from decoded WAV or MPEG-1 audio: RMS, peak,
    zero-crossing rate, duration, plus spectral shape (dominant
    frequency and spectral centroid from one rfft of the first
    channel) — the cheap features audio-corpus filters threshold on
    (silence, tones, clipping, bandwidth)."""
    out_schema = (
        "media_id bigint, rms double, peak double, zcr double, duration_ms int, "
        "dominant_hz double, spectral_centroid_hz double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                fmt = codecs.sniff_format(b)
                if fmt == "wav":
                    try:
                        samples, sr, nch = codecs.decode_wav(b)
                    except ValueError:  # corrupt payload: quarantine, don't crash
                        continue
                elif fmt == "mp3":
                    try:  # MPEG-1 sample decode; undecodable stream -> skip row
                        samples, sr = codecs.decode_mpeg1_audio(b)
                    except ValueError:
                        continue
                    if samples.ndim == 2:  # stereo: interleave like WAV
                        nch = samples.shape[1]
                        samples = samples.reshape(-1)
                    else:
                        nch = 1
                else:
                    continue
                x = samples.astype(np.float64) / 32768.0
                if fmt == "mp3":
                    # codec streams are frame-padded: trim the trailing
                    # near-silent pad (low-level decode noise that would
                    # skew the spectral stats).  WAV payloads keep their
                    # tail — real trailing silence is signal, not padding.
                    nz = np.nonzero(np.abs(x) >= 1e-3)[0]
                    if len(nz) and nz[-1] + 1 < len(x):
                        x = x[: nz[-1] + 1]
                        samples = samples[: nz[-1] + 1]
                zc = np.mean(np.abs(np.diff(np.signbit(x)))) if len(x) > 1 else 0.0
                mono = x[::nch]  # first channel of the interleaved stream
                dom = cent = 0.0
                if len(mono) > 1:
                    spec = np.abs(np.fft.rfft(mono))
                    freqs = np.fft.rfftfreq(len(mono), 1.0 / sr)
                    power = spec.sum()
                    if power > 0:
                        dom = float(freqs[int(np.argmax(spec[1:])) + 1])  # skip DC
                        cent = float((freqs * spec).sum() / power)
                out.append(
                    dict(
                        media_id=mid,
                        rms=float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                        peak=float(np.abs(x).max()) if len(x) else 0.0,
                        zcr=float(zc),
                        duration_ms=int(1000 * len(samples) / (sr * nch)),
                        dominant_hz=dom,
                        spectral_centroid_hz=cent,
                    )
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, out_schema)


def resize_media(df: DataFrame, max_side: int = 64, method: str = "bilinear") -> DataFrame:
    """REAL aspect-preserving resize for bmp/ppm/png/jpeg/gif payloads:
    decode -> numpy resample -> re-encode in the same format (palette
    GIF resamples nearest regardless of ``method``).  Never upscales.
    Non-image / undecodable / corrupt rows pass through untouched
    (ok=false)."""
    out_schema = "media_id bigint, ok boolean, out_width int, out_height int, payload binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        resample = codecs.resize_bilinear if method == "bilinear" else codecs.resize_nearest
        decoders = {
            "bmp": codecs.decode_bmp,
            "ppm": codecs.decode_ppm,
            "png": codecs.decode_png,
            "jpeg": codecs.decode_jpeg,
            "gif": codecs.decode_gif,
        }
        encoders = {
            "bmp": codecs.encode_bmp,
            "ppm": codecs.encode_ppm,
            "png": codecs.encode_png,
            "jpeg": codecs.encode_jpeg,
            "gif": codecs.encode_gif,
        }
        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(b) if b is not None else b""
                fmt = codecs.sniff_format(raw)
                if fmt not in decoders:
                    out.append(dict(media_id=mid, ok=False, out_width=None, out_height=None, payload=raw))
                    continue
                try:
                    arr = decoders[fmt](raw)
                except ValueError:  # corrupt payload: quarantine, don't crash
                    out.append(dict(media_id=mid, ok=False, out_width=None, out_height=None, payload=raw))
                    continue
                h, w = arr.shape[:2]
                scale = min(max_side / max(w, h), 1.0)
                ow, oh = max(int(round(w * scale)), 1), max(int(round(h * scale)), 1)
                # palette formats resample nearest regardless of method:
                # interpolation invents colors a 256-entry palette can't hold
                fmt_resample = codecs.resize_nearest if fmt == "gif" else resample
                res = arr if (ow, oh) == (w, h) else fmt_resample(arr, ow, oh)
                enc = encoders[fmt](res)
                out.append(dict(media_id=mid, ok=True, out_width=ow, out_height=oh, payload=enc))
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, out_schema)


def sample_video_frames(df: DataFrame, max_frames: int = 4) -> DataFrame:
    """REAL animated-media frame sampling: mp4 Motion-JPEG samples come
    out of the sample tables and decode with the from-scratch JPEG codec
    (codecs.decode_mjpeg_frames); GIF animations decode with the
    compositing walker (codecs.decode_gif_frames — r5: transparency +
    disposal semantics).  Emits one row per decoded frame with cheap
    pixel stats; h264/hevc payloads (and any malformed table) quarantine
    as skipped rows, never a stage kill.  Partitioning story matches
    frame_sample_plan: repartition by media_id upstream for codec
    locality."""
    out_schema = (
        "media_id bigint, frame_idx int, width int, height int, luma_mean_milli bigint"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                fmt = codecs.sniff_format(b)
                if fmt not in ("mp4", "gif"):
                    continue
                try:
                    if fmt == "gif":
                        frames = codecs.decode_gif_frames(b, max_frames=max_frames)
                    else:
                        frames = codecs.decode_mjpeg_frames(b, max_frames=max_frames)
                except ValueError:  # non-MJPEG codec or corrupt payload: skip
                    continue
                for i, arr in enumerate(frames):
                    rgb = codecs.to_rgb(arr).astype(np.float64)
                    luma = rgb @ np.array([0.299, 0.587, 0.114])
                    out.append(
                        dict(
                            media_id=mid, frame_idx=i,
                            width=arr.shape[1], height=arr.shape[0],
                            luma_mean_milli=int(round(float(luma.mean()) * 1000)),
                        )
                    )
            yield pd.DataFrame(
                out if out else {
                    "media_id": pd.Series([], dtype="int64"),
                    "frame_idx": pd.Series([], dtype="int32"),
                    "width": pd.Series([], dtype="int32"),
                    "height": pd.Series([], dtype="int32"),
                    "luma_mean_milli": pd.Series([], dtype="int64"),
                }
            )

    return df.mapInPandas(kernel, out_schema)


def extract_audio_tags(df: DataFrame) -> DataFrame:
    """Descriptive audio metadata for the corpus catalog: ID3v2 text
    frames (title/artist/album/year/genre — codecs.parse_id3_tags)
    per Arrow batch.  Non-mp3 and tagless payloads yield all-None tag
    columns with ok=true; genuinely malformed tags quarantine as
    ok=false + err, never a stage kill (the decode_media contract)."""
    out_schema = (
        "media_id bigint, ok boolean, err string, "
        "title string, artist string, album string, year string, genre string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from esgopeta_spark.operators import codecs

        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b) if b is not None else b""
                rec = dict(media_id=mid, ok=True, err=None,
                           title=None, artist=None, album=None, year=None, genre=None)
                try:
                    rec.update(codecs.parse_id3_tags(b))
                except ValueError as exc:
                    rec.update(ok=False, err=f"corrupt:{exc}"[:200])
                out.append(rec)
            yield pd.DataFrame(
                out if out else {
                    "media_id": pd.Series([], dtype="int64"),
                    "ok": pd.Series([], dtype="bool"),
                    "err": pd.Series([], dtype="object"),
                    **{c: pd.Series([], dtype="object")
                       for c in ("title", "artist", "album", "year", "genre")},
                }
            )

    return df.select("media_id", "payload").mapInPandas(kernel, out_schema)


# ---------------------------------------------------------------------------
# image near-dup: dHash fingerprint + banded Hamming join (G2 for images)
# ---------------------------------------------------------------------------


def decode_image_any(b: bytes):
    """Sniff + decode any supported image payload to (h, w, 3) uint8 RGB;
    ValueError for non-image / undecodable payloads (quarantine
    contract).  Grayscale decodes broadcast to 3 channels."""
    import numpy as np

    from esgopeta_spark.operators import codecs

    fmt = codecs.sniff_format(b)
    if fmt == "bmp":
        arr = codecs.decode_bmp(b)
    elif fmt == "ppm":
        arr = codecs.decode_ppm(b)
    elif fmt == "png":
        arr = codecs.decode_png(b)
    elif fmt == "jpeg":
        arr = codecs.decode_jpeg(b)
        # orientation-normalize (r9): phone cameras store rotated pixels
        # + an Exif Orientation tag, so the SAME photo ships as up to 8
        # pixel layouts — uprighting here makes every fingerprint
        # downstream metadata-rotation-invariant.  A malformed Exif
        # segment must not poison an otherwise-decodable image: fall
        # back to the stored layout.
        try:
            arr = codecs.apply_exif_orientation(arr, codecs.parse_exif(b)["orientation"])
        except ValueError:
            pass
    elif fmt == "gif":
        arr = codecs.decode_gif(b)
    elif fmt == "tiff":
        arr = codecs.decode_tiff(b)
    else:
        raise ValueError(f"not a decodable image: {fmt}")
    # codecs.to_rgb covers every decode shape incl. (h, w, 2) gray+alpha
    # — an ad-hoc normalization here once missed that case and leaked an
    # IndexError past the ValueError-only quarantine (r8 review)
    return codecs.to_rgb(arr)


def _luma_resized(arr, out_w: int, out_h: int):
    """Integer luma ((77R + 150G + 29B) >> 8 — weights sum to 256, so a
    uniform brightness shift moves every luma value by exactly the
    shift) bilinear-resized on UNROUNDED floats (same align-corners=False
    grid as codecs.resize_bilinear): the shift then moves every sampled
    value by exactly the shift — rounding to uint8 first would break the
    invariance at half-integer ties.

    r11 (closing the r9 tRNS ADVICE end to end): alpha channels (gray+A
    / RGBA — PNG color types 4/6 and tRNS-expanded decodes) COMPOSITE
    over white before luma, integer-exact c' = (c*a + 255*(255-a) +
    127) // 255 — a transparent background must hash as the background
    it renders as, not as the arbitrary RGB values under it, or
    visually-distinct images pair in dHash/pHash dedup.  Fully-opaque
    alpha is a no-op (c' == c exactly), so RGB fixtures and opaque RGBA
    hash identically; 1-channel gray replicates (256*g >> 8 == g)."""
    import numpy as np

    if arr.ndim == 2:
        arr = arr[:, :, None]
    ch = arr.shape[2]
    a = arr.astype(np.int64)
    if ch in (2, 4):
        al = a[:, :, ch - 1]
        rgb = (a[:, :, : ch - 1] * al[:, :, None]
               + 255 * (255 - al)[:, :, None] + 127) // 255
        a = np.concatenate([rgb] * (3 if ch == 2 else 1), axis=2)
    elif ch == 1:
        a = np.concatenate([a, a, a], axis=2)
    luma = ((77 * a[:, :, 0] + 150 * a[:, :, 1] + 29 * a[:, :, 2]) >> 8).astype(np.float64)
    h, w = luma.shape
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.floor(ys).astype(np.int64).clip(0, h - 1)
    x0 = np.floor(xs).astype(np.int64).clip(0, w - 1)
    y1 = (y0 + 1).clip(0, h - 1)
    x1 = (x0 + 1).clip(0, w - 1)
    wy = (ys - y0).clip(0.0, 1.0)[:, None]
    wx = (xs - x0).clip(0.0, 1.0)[None, :]
    top = luma[y0][:, x0] * (1 - wx) + luma[y0][:, x1] * wx
    bot = luma[y1][:, x0] * (1 - wx) + luma[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def dhash64(arr) -> int:
    """64-bit difference hash of an RGB image: luma, bilinear resize to
    9x8, bit (r, c) = luma[r, c+1] > luma[r, c].  Horizontal-gradient
    signs are INVARIANT to brightness shifts and near-invariant to
    recompression noise — the classic image near-dup fingerprint
    (public: Krawetz's dHash / pHash family)."""
    g = _luma_resized(arr, 9, 8)
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)  # 8x8 row-major
    fp = 0
    for i in range(64):
        if bits[i]:
            fp |= 1 << i
    return fp - (1 << 64) if fp >= 1 << 63 else fp  # two's-complement int64


def _dct_mat(n: int):
    """Orthonormal DCT-II basis (the jpeg.py transform, public formula)."""
    import numpy as np

    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    c = np.cos(np.pi / n * (t + 0.5) * k) * np.sqrt(2.0 / n)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_PHASH_DCT = None


def phash64(arr) -> int:
    """64-bit perceptual (DCT) hash: luma to 32x32, 2-D orthonormal
    DCT-II, keep the top-left 8x8 low-frequency block, bit i = coeff >
    median of the 63 AC coefficients (the DC slot's bit is constant 0 —
    excluding DC keeps the hash brightness-invariant: a uniform shift
    only moves the [0,0] basis).  Coefficients are quantized to 1/1024
    integers BEFORE the median compare: raw float DCT of a
    brightness-shifted image perturbs every AC coefficient by ~1e-12,
    which flips tie-adjacent median comparisons; on the integer grid the
    epsilon vanishes and the hash is bit-stable under uniform shifts
    (measured: 0 flips over a 7-class x 40-shift grid where the float
    version flipped in every class).  Captures global structure where
    dHash captures local gradients; prefer dHash for sparse/synthetic
    patterns (few nonzero DCT coefficients make the pHash median
    degenerate)."""
    import numpy as np

    global _PHASH_DCT
    if _PHASH_DCT is None:
        _PHASH_DCT = _dct_mat(32)
    g = _luma_resized(arr, 32, 32)
    d = _PHASH_DCT @ g @ _PHASH_DCT.T
    ac = np.rint(np.delete(d[:8, :8].reshape(-1), 0) * 1024.0).astype(np.int64)
    med = np.median(ac)
    bits = ac > med  # 63 bits; bit 63 stays 0
    fp = 0
    for i in range(63):
        if bits[i]:
            fp |= 1 << i
    return fp  # < 2^63, already a valid int64


def image_dhash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id",
    method: str = "dhash",
) -> DataFrame:
    """(id, dhash) fingerprints for an image corpus via one Arrow
    mapInPandas kernel over the from-scratch decoders — no shuffle, no
    collect; undecodable/poison payloads are SKIPPED (quarantine), never
    stage-killing.  ``method`` picks the fingerprint: "dhash" (gradient
    signs) or "phash" (DCT block vs median)."""
    out_schema = f"{id_col} bigint, dhash bigint"
    hash_fn = {"dhash": dhash64, "phash": phash64}[method]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    fps.append(hash_fn(decode_image_any(bytes(b) if b is not None else b"")))
                    ids.append(int(mid))
                except ValueError:
                    continue
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "dhash": pd.Series(fps, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def image_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Per-image INTEGER quality statistics over the from-scratch
    decoders — the signals an image-corpus filter keys on: dimensions,
    gray sum / sum-of-squares (brightness, contrast), horizontal and
    vertical gradient energy (sharpness; near-zero = flat/blurred or
    synthetic fill), and mean gray in milli units.

      gray    = (r + g + b) div 3 per pixel (exact integer)
      edge_h  = Σ |gray[r, c+1] − gray[r, c]|
      edge_v  = Σ |gray[r+1, c] − gray[r, c]|
      mean_gray_milli = (sum_gray · 1000) div (width · height)

    Every statistic is an exact int64 (no float leaves the kernel), so
    through a LOSSLESS codec (PNG/BMP/PPM) the values are closed-form
    computable from the planted pixels — the FLAC-style strong oracle
    shape.  Undecodable/poison payloads are skipped (quarantine).

    Scale shape: one Arrow mapInPandas decode pass, no shuffle, no
    collect — cost is the codec, proportional to rows."""
    out_schema = (
        f"{id_col} bigint, width int, height int, sum_gray bigint, "
        "sum_gray_sq bigint, edge_h bigint, edge_v bigint, "
        "mean_gray_milli bigint"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = decode_image_any(bytes(b) if b is not None else b"")
                except ValueError:
                    continue
                g = arr.astype(np.int64).sum(axis=-1) // 3
                h, w = g.shape
                s = int(g.sum())
                rows.append(
                    {
                        id_col: int(mid),
                        "width": w,
                        "height": h,
                        "sum_gray": s,
                        "sum_gray_sq": int((g * g).sum()),
                        "edge_h": int(np.abs(np.diff(g, axis=1)).sum()),
                        "edge_v": int(np.abs(np.diff(g, axis=0)).sum()),
                        "mean_gray_milli": (s * 1000) // (w * h),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def image_blur_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Second-derivative BLUR detection per image (r12) — the standard
    Laplacian blur metric image-curation filters threshold on (LAION-
    style pipelines drop low-Laplacian images).  ``image_stats``'s
    edge_h/edge_v first derivatives cannot tell a SMOOTH RAMP (high
    gradient, no detail) from a true edge; the Laplacian can — a
    linear ramp's second derivative is exactly 0 while a step or
    texture scores high (both pinned closed-form in the oracle).

    Over the 4·luma plane (r + 2g + b — integer, no division):

      lap_l1  = Σ over strict-interior pixels |4c − up − down − left − right|
      grad_l1 = Σ over the same pixels |right − left| + |down − up|
                (centered first differences, same support)
      lap_mean_milli = lap_l1 · 1000 div n_interior

    Exact int64 end-to-end, so through a lossless codec every value is
    closed-form computable from planted patterns: constant (both 0),
    step edge (both ∝ edge length), linear ramp (grad high, LAP ZERO —
    the case that separates this op from image_stats), checkerboard
    (lap maximal, centered grad ZERO).  Undecodable payloads emit the
    VISIBLE all--1 marker row.  One Arrow decode pass, no shuffle."""
    out_schema = (
        f"{id_col} bigint, width int, height int, n_interior bigint, "
        "lap_l1 bigint, grad_l1 bigint, lap_mean_milli bigint"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = decode_image_any(bytes(b) if b is not None else b"")
                except ValueError:
                    rows.append({id_col: int(mid), "width": -1, "height": -1,
                                 "n_interior": -1, "lap_l1": -1,
                                 "grad_l1": -1, "lap_mean_milli": -1})
                    continue
                a = arr.astype(np.int64)
                g = a[..., 0] + 2 * a[..., 1] + a[..., 2]  # 4*luma, exact
                h, w = g.shape
                if h < 3 or w < 3:
                    rows.append({id_col: int(mid), "width": w, "height": h,
                                 "n_interior": 0, "lap_l1": 0,
                                 "grad_l1": 0, "lap_mean_milli": 0})
                    continue
                c = g[1:-1, 1:-1]
                up, dn = g[:-2, 1:-1], g[2:, 1:-1]
                lf, rt = g[1:-1, :-2], g[1:-1, 2:]
                lap = int(np.abs(4 * c - up - dn - lf - rt).sum())
                grad = int(np.abs(rt - lf).sum() + np.abs(dn - up).sum())
                ni = (h - 2) * (w - 2)
                rows.append({
                    id_col: int(mid), "width": w, "height": h,
                    "n_interior": ni, "lap_l1": lap, "grad_l1": grad,
                    "lap_mean_milli": (lap * 1000) // ni,
                })
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def image_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    payload_col: str = "payload",
    id_col: str = "media_id",
    method: str = "dhash",
) -> DataFrame:
    """Image near-dup pairs: dHash or pHash fingerprints -> the SAME
    banded Hamming equi-join as SimHash text near-dup (dedup.py
    banded_hamming_pairs: 4x16-bit bands, pigeonhole-complete for
    hamming<=3, never all-pairs).  Returns (id_a, id_b, hamming)."""
    from esgopeta_spark.operators.dedup import banded_hamming_pairs
    from esgopeta_spark.session import ensure_min_partitions

    fp = image_dhash(ensure_min_partitions(df), payload_col, id_col, method)
    return banded_hamming_pairs(fp, max_hamming, id_col=id_col, fp_col="dhash")


# ---------------------------------------------------------------------------
# audio near-dup: spectral difference-hash + banded Hamming join
# ---------------------------------------------------------------------------


def _onset_start(x, hop: int = 32, rel_milli: int = 50) -> int:
    """Sample index of the first ``hop``-sample window whose ENERGY
    reaches ``rel_milli``/1000 of the loudest window — the offset-
    normalized anchor that makes the fingerprint below shift-robust.
    The threshold is RELATIVE, so gain scaling cannot move the anchor;
    codec leakage/pre-echo in a silence-padded lead-in sits orders of
    magnitude under 5% of the loudest window and is skipped."""
    import numpy as np

    n = len(x) - len(x) % hop
    if n <= 0:
        return 0
    e = (x[:n].reshape(-1, hop) ** 2).sum(axis=1)
    emax = float(e.max())
    if emax <= 0.0:
        return 0
    idx = np.nonzero(e >= emax * (rel_milli / 1000.0))[0]
    return int(idx[0]) * hop if len(idx) else 0


def _fp_band_edges(nbins: int, nbands: int):
    """Log-spaced band edges over rfft bins [1, nbins) (bin 0 = DC,
    excluded), deduplicated and padded so exactly nbands bands exist."""
    import numpy as np

    e = np.unique(np.round(np.geomspace(1, nbins, nbands + 1)).astype(np.int64))
    i = 1
    while len(e) < nbands + 1:
        e = np.unique(np.append(e, e[-1] + i))
        i += 1
    return e[: nbands + 1]


def audio_fp64(samples) -> int:
    """64-bit SPECTRAL-PROFILE hash of decoded PCM, shift-robust by
    construction (r9 redesign, verdict #3 — the r8 temporal-gradient
    hash over fixed offset-0 frames never paired a copy with trimmed
    silence or a different encoder delay, and measured 15+ bit drift
    under a 4-sample misalignment): mono-ize, anchor at the signal ONSET
    (first 32-sample window reaching 5% of the peak window energy — a
    RELATIVE threshold, so gain cannot move the anchor), split the next
    4x2048 samples into Hann-windowed segments (Hann kills the
    rectangular-window leakage that made band energies misalignment-
    sensitive), take 17 log-spaced band energies per segment, integerize
    to per-segment micro-units (tie-hardening house rule: empty bands
    quantize to equal zeros instead of comparing FFT noise), and emit
    the 16 FREQUENCY-gradient signs per segment (bit (s, b) =
    E[s][b+1] > E[s][b]) — spectral shape x coarse time structure.
    Measured on the 6-class oracle corpus: hamming 0 under +-5000-sample
    shifts AND through this module's MPEG-1 codecs (incl. both at once),
    EXACTLY invariant to power-of-two gain, cross-class min distance 12
    (tests/test_llm_ops.py test_audio_fingerprint_shift_robust,
    test_audio_fingerprint_entry_classes_separated)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    x = x[_onset_start(x):]
    n_seg, seg = 4, 2048
    need = n_seg * seg
    if len(x) < need:
        x = np.concatenate([x, np.zeros(need - len(x))])
    segs = x[:need].reshape(n_seg, seg) * np.hanning(seg)[None, :]
    spec = np.abs(np.fft.rfft(segs, axis=1)) ** 2
    edges = _fp_band_edges(spec.shape[1], 17)
    e = np.stack(
        [spec[:, edges[i] : edges[i + 1]].sum(axis=1) for i in range(17)], axis=1
    )  # 4x17
    tot = e.sum(axis=1, keepdims=True)
    tot[tot <= 0.0] = 1.0
    e = np.floor(e / tot * 1_000_000)  # integerize: ties become exact zeros
    bits = (e[:, 1:] > e[:, :-1]).reshape(-1)  # 4*16 = 64
    fp = 0
    for i in range(64):
        if bits[i]:
            fp |= 1 << i
    return fp - (1 << 64) if fp >= 1 << 63 else fp  # two's-complement int64


def decode_audio_any(b: bytes):
    """Sniff + decode any supported audio payload to (samples, rate);
    ValueError for non-audio / undecodable payloads."""
    from esgopeta_spark.operators import codecs

    fmt = codecs.sniff_format(b)
    if fmt == "wav":
        samples, sr, nch = codecs.decode_wav(b)
        if nch > 1:
            samples = samples.reshape(-1, nch)
        return samples, sr
    if fmt == "mp3":
        return codecs.decode_mpeg1_audio(b)
    if fmt == "flac":
        arr, sr, _bps = codecs.decode_flac(b)
        return (arr[:, 0] if arr.shape[1] == 1 else arr), sr
    raise ValueError(f"not a decodable audio payload: {fmt}")


def audio_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    quiet_milli: int = 10,
) -> DataFrame:
    """Per-clip INTEGER loudness/quality statistics over the
    from-scratch audio decoders — the audio-corpus filter signals:

      n_samples, sample_rate
      sum_abs, sum_sq          loudness / energy (int64-exact)
      peak                     max |sample|
      n_clipped                samples at full scale (|s| >= 32767 —
                               hard-clipping detector)
      n_quiet                  samples with |s| <= 32767·quiet_milli
                               div 1000 (silence-ratio numerator)
      mean_abs_milli           (sum_abs · 1000) div n_samples

    Every statistic is exact int64 on the decoded int16 stream, so
    through a LOSSLESS codec (WAV, FLAC) the values are closed-form
    computable from planted waveforms — the strong-oracle shape
    ``image_stats`` uses.  Undecodable/poison payloads are skipped
    (quarantine).  Multichannel clips count every channel-sample.

    Scale shape: one Arrow mapInPandas decode pass, no shuffle."""
    out_schema = (
        f"{id_col} bigint, n_samples bigint, sample_rate int, "
        "sum_abs bigint, sum_sq bigint, peak bigint, n_clipped bigint, "
        "n_quiet bigint, mean_abs_milli bigint"
    )
    thr = (32767 * int(quiet_milli)) // 1000

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, sr = decode_audio_any(bytes(b) if b is not None else b"")
                except ValueError:
                    continue
                a = np.abs(samples.astype(np.int64).reshape(-1))
                n = int(a.size)
                if n == 0:
                    continue
                sa = int(a.sum())
                rows.append(
                    {
                        id_col: int(mid),
                        "n_samples": n,
                        "sample_rate": int(sr),
                        "sum_abs": sa,
                        "sum_sq": int((a * a).sum()),
                        "peak": int(a.max()),
                        "n_clipped": int((a >= 32767).sum()),
                        "n_quiet": int((a <= thr).sum()),
                        "mean_abs_milli": (sa * 1000) // n,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def audio_vad_segments(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame: int = 512,
    thresh_milli: int = 10,
) -> DataFrame:
    """Energy-threshold voice-activity SEGMENTATION per clip — the
    speech-corpus trimmer/segmenter (r12): where does activity start
    and end, how many separate utterances, how much lead/tail silence
    can a pipeline cut before paying storage and training tokens for
    dead air.  ``audio_stats`` counts quiet SAMPLES; this op finds the
    quiet STRUCTURE.

    The decoded interleaved int16 stream is cut into fixed ``frame``-
    sample windows (the trailing partial frame is ignored —
    documented); a frame is ACTIVE when its integer mean |sample|
    clears the threshold:  sum|s| * 1000 >= thresh_milli * 32767 *
    frame.  Segments are maximal runs of active frames (no gap
    bridging — deterministic and closed-form; bridge upstream by
    lowering the threshold if a corpus needs it).  All outputs exact
    int64, so through a LOSSLESS codec (WAV, FLAC) every value is
    closed-form computable from planted waveforms — the audio_stats
    strong-oracle shape.

    One row per clip: (id, n_frames, n_active, n_segments,
    first_active, last_active, lead_silence, tail_silence) — frame
    indices, -1 sentinels when no frame is active.  Undecodable /
    poison payloads emit a VISIBLE all--1 marker row (never a silent
    drop — the house quarantine-marker discipline).

    Scale shape: one Arrow mapInPandas decode pass, kernel-local
    segmentation, no shuffle."""
    out_schema = (
        f"{id_col} bigint, n_frames bigint, n_active bigint, "
        "n_segments bigint, first_active bigint, last_active bigint, "
        "lead_silence bigint, tail_silence bigint"
    )
    fr = int(frame)
    bar = int(thresh_milli) * 32767 * fr  # compare sum|s|*1000 to this

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, _sr = decode_audio_any(
                        bytes(b) if b is not None else b""
                    )
                    a = np.abs(samples.astype(np.int64).reshape(-1))
                except ValueError:
                    rows.append({id_col: int(mid), "n_frames": -1,
                                 "n_active": -1, "n_segments": -1,
                                 "first_active": -1, "last_active": -1,
                                 "lead_silence": -1, "tail_silence": -1})
                    continue
                nf = int(a.size) // fr
                fa = a[: nf * fr].reshape(nf, fr).sum(axis=1) * 1000 >= bar
                idx = np.nonzero(fa)[0]
                if len(idx) == 0:
                    rows.append({id_col: int(mid), "n_frames": nf,
                                 "n_active": 0, "n_segments": 0,
                                 "first_active": -1, "last_active": -1,
                                 "lead_silence": nf, "tail_silence": nf})
                    continue
                segs = 1 + int((np.diff(idx) > 1).sum())
                rows.append({
                    id_col: int(mid), "n_frames": nf,
                    "n_active": int(len(idx)), "n_segments": segs,
                    "first_active": int(idx[0]),
                    "last_active": int(idx[-1]),
                    "lead_silence": int(idx[0]),
                    "tail_silence": int(nf - 1 - idx[-1]),
                })
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def audio_curation_profile(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame: int = 512,
    thresh_milli: int = 10,
    quiet_milli: int = 10,
) -> DataFrame:
    """DECODE-ONCE audio curation (r12): every per-clip signal the
    curation gate thresholds on — loudness/energy/clipping/quiet
    counters (the ``audio_stats`` battery) AND the VAD segment
    structure (the ``audio_vad_segments`` battery) — from ONE decode
    pass.  The codec dominates media-pipeline cost; running the two
    ops separately decodes every clip twice, so the fused kernel is
    the production shape (the separate ops remain the composable
    primitives; the math here is identical line-for-line, pinned in
    pytest by equality against both).

    Output: (id, n_samples, sample_rate, sum_abs, peak, n_clipped,
    n_quiet, n_frames, n_active, n_segments, lead_silence,
    tail_silence) — exact int64; undecodable payloads emit the VISIBLE
    all--1 marker row.  One Arrow mapInPandas pass, no shuffle."""
    out_schema = (
        f"{id_col} bigint, n_samples bigint, sample_rate int, "
        "sum_abs bigint, peak bigint, n_clipped bigint, n_quiet bigint, "
        "n_frames bigint, n_active bigint, n_segments bigint, "
        "lead_silence bigint, tail_silence bigint"
    )
    fr = int(frame)
    bar = int(thresh_milli) * 32767 * fr
    qthr = (32767 * int(quiet_milli)) // 1000

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        marker = {k: -1 for k in (
            "n_samples", "sample_rate", "sum_abs", "peak", "n_clipped",
            "n_quiet", "n_frames", "n_active", "n_segments",
            "lead_silence", "tail_silence")}
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, sr = decode_audio_any(
                        bytes(b) if b is not None else b"")
                    a = np.abs(samples.astype(np.int64).reshape(-1))
                except ValueError:
                    rows.append({id_col: int(mid), **marker})
                    continue
                n = int(a.size)
                nf = n // fr
                fa = (a[: nf * fr].reshape(nf, fr).sum(axis=1) * 1000 >= bar
                      if nf else np.zeros(0, dtype=bool))
                idx = np.nonzero(fa)[0]
                if len(idx):
                    segs = 1 + int((np.diff(idx) > 1).sum())
                    first, last = int(idx[0]), int(idx[-1])
                    lead, tail = first, nf - 1 - last
                    nact = int(len(idx))
                else:
                    segs, nact, lead, tail = 0, 0, nf, nf
                rows.append({
                    id_col: int(mid),
                    "n_samples": n,
                    "sample_rate": int(sr),
                    "sum_abs": int(a.sum()),
                    "peak": int(a.max()) if n else 0,
                    "n_clipped": int((a >= 32767).sum()),
                    "n_quiet": int((a <= qthr).sum()),
                    "n_frames": nf,
                    "n_active": nact,
                    "n_segments": segs,
                    "lead_silence": lead,
                    "tail_silence": tail,
                })
            if rows:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def audio_fingerprint(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """(id, afp) fingerprints for an audio corpus via one Arrow
    mapInPandas kernel over the from-scratch decoders (WAV + all MPEG-1
    layers) — no shuffle, no collect; undecodable/poison payloads are
    SKIPPED (quarantine)."""
    out_schema = f"{id_col} bigint, afp bigint"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, _sr = decode_audio_any(bytes(b) if b is not None else b"")
                    fps.append(audio_fp64(samples))
                    ids.append(int(mid))
                except ValueError:
                    continue
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "afp": pd.Series(fps, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def audio_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio near-dup pairs: spectral fingerprints -> the shared banded
    Hamming equi-join (dedup.py banded_hamming_pairs — pigeonhole-
    complete for hamming<=3, never all-pairs).  Catches the same clip
    re-encoded at a different volume or through a different codec —
    the dominant duplicate mode in scraped audio corpora."""
    from esgopeta_spark.operators.dedup import banded_hamming_pairs
    from esgopeta_spark.session import ensure_min_partitions

    fp = audio_fingerprint(ensure_min_partitions(df), payload_col, id_col)
    return banded_hamming_pairs(fp, max_hamming, id_col=id_col, fp_col="afp")


# ---------------------------------------------------------------------------
# video near-dup: per-frame dHash + shared-frame pair join
# ---------------------------------------------------------------------------


def video_frame_hashes(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id",
    max_frames: int = 8,
) -> DataFrame:
    """(id, frame_idx, dhash) per decoded frame of MJPEG-mp4 / animated
    GIF payloads — sample-table walk + from-scratch JPEG/GIF decode +
    the image dHash, one Arrow mapInPandas kernel.  Non-video and poison
    payloads are skipped (quarantine)."""
    out_schema = f"{id_col} bigint, frame_idx int, dhash bigint"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from esgopeta_spark.operators import codecs

        for pdf in batches:
            ids, idxs, fps = [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b) if b is not None else b""
                fmt = codecs.sniff_format(b)
                try:
                    if fmt == "gif":
                        frames = codecs.decode_gif_frames(b, max_frames=max_frames)
                    elif fmt == "mp4":
                        frames = codecs.decode_mjpeg_frames(b, max_frames=max_frames)
                    elif fmt == "m1v":
                        # r14: real MPEG-1 intra decode (keyframes)
                        frames = codecs.decode_mpeg1_video_frames(
                            b, max_frames=max_frames)
                    else:
                        continue
                except ValueError:
                    continue
                for j, fr in enumerate(frames):
                    arr = fr["img"] if isinstance(fr, dict) else fr
                    if arr.ndim == 2:
                        arr = np.stack([arr] * 3, axis=-1)
                    ids.append(int(mid))
                    idxs.append(j)
                    fps.append(dhash64(arr))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "dhash": pd.Series(fps, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def video_scene_stats(
    df: DataFrame,
    cut_hamming: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_frames: int = 8,
) -> DataFrame:
    """Scene-change detection over the per-frame fingerprint stream: a
    CUT is a consecutive-frame pair whose dHash Hamming distance exceeds
    ``cut_hamming`` (within a scene the perceptual hash drifts a few
    bits; across a hard cut it jumps — the classic shot-boundary
    heuristic on a 64-bit perceptual hash).  Returns per video
    (id, n_frames, n_cuts, n_scenes = n_cuts + 1, max_cut_hamming).

    A training pipeline uses this for frame-sampling (one keyframe per
    scene beats uniform sampling) and for flagging slideshow/static
    videos (n_scenes == 1).

    Scale shape: the decode kernel is the shared ``video_frame_hashes``
    Arrow pass; the cut detection is ONE lag window partitioned by
    video (frames per video are bounded by ``max_frames``, so no skew),
    then a per-video aggregate — no joins, nothing all-pairs."""
    fh = video_frame_hashes(df, payload_col, id_col, max_frames)
    win = Window.partitionBy(id_col).orderBy("frame_idx")
    d = fh.select(
        id_col,
        "dhash",
        F.lag("dhash").over(win).alias("_prev"),
    )
    ham = F.when(
        F.col("_prev").isNull(), F.lit(None)
    ).otherwise(F.bit_count(F.expr("_prev ^ dhash")))
    return (
        d.select(id_col, ham.alias("_ham"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.sum(
                (F.col("_ham") > F.lit(int(cut_hamming))).cast("int")
            ).cast("bigint").alias("n_cuts"),
            F.max("_ham").cast("bigint").alias("max_cut_hamming"),
        )
        .select(
            id_col,
            "n_frames",
            F.coalesce(F.col("n_cuts"), F.lit(0)).alias("n_cuts"),
            (F.coalesce(F.col("n_cuts"), F.lit(0)) + 1).alias("n_scenes"),
            "max_cut_hamming",
        )
    )


def video_dup_pairs(
    df: DataFrame,
    min_shared_frames: int = 2,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_frames: int = 8,
) -> DataFrame:
    """Video near-dup: two videos pair when they share at least
    ``min_shared_frames`` distinct frame fingerprints — catches re-cuts,
    re-containered copies and shared-footage clips without any
    all-pairs comparison.  Scale shape: per-frame dHash stream ->
    self-equi-join on the 64-bit hash (bucketed by fingerprint value,
    like every near-dup join here) -> per-pair distinct-hash count.
    Returns (id_a, id_b, n_shared_frames)."""
    from esgopeta_spark.session import ensure_min_partitions

    fh = video_frame_hashes(
        ensure_min_partitions(df), payload_col, id_col, max_frames
    ).select(F.col(id_col).alias("_id"), "dhash").distinct()
    fh = fh.localCheckpoint()  # both join sides read the decode output
    a, b = fh.alias("a"), fh.alias("b")
    return (
        a.join(b, (F.col("a.dhash") == F.col("b.dhash")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        # plain count: both join sides are already .distinct() on
        # (id, hash), so per-group hashes are unique — countDistinct
        # would pay per-group dedup-set state for nothing (r8 review)
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= F.lit(int(min_shared_frames)))
    )


def video_keyframes(
    df: DataFrame,
    cut_hamming: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_frames: int = 8,
) -> DataFrame:
    """Scene-representative KEYFRAME selection (r14 — the video
    training pipeline's frame-sampling step: one frame per scene beats
    uniform sampling, SURVEY §2 G5): frame 0 and every frame that
    opens a new scene (lag-dHash Hamming above ``cut_hamming``) is a
    keyframe; each carries its scene ordinal.  Returns
    (id, frame_idx, scene_idx, dhash) — one row per keyframe.

    Scale shape: the decode+hash kernel is the SHARED
    ``video_frame_hashes`` Arrow pass (GIF / MJPEG / MPEG-1 intra);
    selection is one lag window partitioned by video (frames bounded
    by ``max_frames``, no skew) — no joins, nothing all-pairs."""
    fh = video_frame_hashes(df, payload_col, id_col, max_frames)
    win = Window.partitionBy(id_col).orderBy("frame_idx")
    d = fh.select(
        id_col, "frame_idx", "dhash",
        F.lag("dhash").over(win).alias("_prev"),
    )
    is_cut = F.when(F.col("_prev").isNull(), F.lit(1)).otherwise(
        (F.bit_count(F.expr("_prev ^ dhash")) > F.lit(int(cut_hamming)))
        .cast("int")
    )
    scored = d.select(
        id_col, "frame_idx", "dhash", is_cut.alias("_key"),
        F.sum(is_cut).over(
            win.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("_scene1"),
    )
    return scored.where(F.col("_key") == 1).select(
        id_col, "frame_idx",
        (F.col("_scene1") - 1).cast("bigint").alias("scene_idx"),
        "dhash",
    )
