"""Pure-numpy media codecs (G5).

The container ships no PIL/librosa/ffmpeg, but every IMAGE format plus
PCM audio is implemented from scratch on struct + numpy + stdlib:
BMP (24-bit BI_RGB), PPM (P6), WAV (PCM16), PNG via stdlib ``zlib``
(baseline non-interlaced: bit depth 8, gray/RGB/gray+alpha/RGBA, all
five scanline filters), and JPEG (operators.jpeg: baseline SOF0 and
progressive SOF2 — spectral selection + successive approximation —
sampling factors to 2x2 incl. 4:2:0, restart markers, per-image
canonical Huffman on encode), GIF (from-scratch variable-width LZW,
87a/89a, interlace), and TIFF (baseline 6.0 subset: II/MM byte orders,
8-bit gray incl. min-is-white and RGB, strip layout, Compression 1,
PackBits RLE and LZW with the Predictor-2 horizontal differencing).  Compressed AUDIO/VIDEO containers (mp3/mp4) get
real METADATA parsing (ISO BMFF box walk, MPEG frame-header scan) —
duration/dims/rates for corpus stats and filtering — mp4 video frames
DECODE for real for the Motion-JPEG subset (``decode_mjpeg_frames``:
sample-table walk + the from-scratch JPEG codec per sample), FLAC
decodes for real (operators/flac.py: all subframe types, all fixed and
LPC orders, Rice partitions, CRC-verified), and MPEG-1
audio samples DECODE for real for all three layers
(operators/mpeg1_audio.py; Layer III incl. Huffman regions, bit
reservoir, hybrid IMDCT, MS + intensity joint stereo; Layer I/II incl.
intensity); only h264/hevc frames remain behind the needs-codec guard
in operators.multimodal.

Everything here is plain bytes->ndarray (and back) so the same functions
run inside Arrow-batched mapInPandas kernels on executors and in local
oracle tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# format sniffing
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# quarantine contract: every decode/parse entry point raises ONLY ValueError
# on malformed input.  The mapInPandas kernels catch ValueError to quarantine
# poison payloads; any other exception type (struct.error from a truncated
# header, IndexError from a short buffer, zlib.error from corrupt deflate)
# would escape the except and KILL THE STAGE — exactly what the quarantine
# posture exists to prevent.  tests/test_codecs.py fuzzes this contract.
# ---------------------------------------------------------------------------


def _quarantine(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except (struct.error, IndexError, KeyError, OverflowError, zlib.error, EOFError, TypeError) as exc:
            raise ValueError(f"malformed payload: {type(exc).__name__}: {exc}") from exc

    return wrapped


_MAGICS = [
    (b"BM", "bmp"),
    (b"P6", "ppm"),
    (b"RIFF", "wav"),  # refined below (RIFF....WAVE)
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"ID3", "mp3"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"fLaC", "flac"),
    # NOTE: no raw \xff\xfb magic — bare frame sync is validated
    # field-by-field in sniff_format below (r6 ADVICE)
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"%PDF-", "pdf"),  # r11: routed to operators/pdf.extract_pdf_text
    # r14: MPEG-1 video elementary stream (sequence_header_code) —
    # routed to operators/mpeg1_video intra decode
    (b"\x00\x00\x01\xb3", "m1v"),
]

DECODABLE = {"bmp", "ppm", "wav", "png", "jpeg", "gif", "tiff", "flac"}


def sniff_format(b: bytes | None) -> str:
    if not b:
        return "empty"
    for magic, name in _MAGICS:
        if b[: len(magic)] == magic:
            if name == "wav" and b[8:12] != b"WAVE":
                return "riff-other"
            if name == "mp3" and len(b) >= 10:
                # an ID3v2 envelope wraps mp3 AND (in the wild,
                # nonstandard but common) FLAC: peek past the synchsafe
                # tag size to classify by the real payload
                size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
                       ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
                off = 10 + size + (10 if len(b) > 5 and b[5] & 0x10 else 0)
                if b[off : off + 4] == b"fLaC":
                    return "flac"
            return name
    if len(b) >= 12 and b[4:8] == b"ftyp":  # ISO BMFF (mp4/mov)
        return "mp4"
    # MPEG audio frame sync — the 11-bit sync alone matches ~1/2048 of
    # random 2-byte pairs, so also require valid (non-reserved) version,
    # layer, bitrate and sample-rate fields before claiming the family
    # (r6 ADVICE: random payloads previously misreported as 'mp3')
    if (
        len(b) >= 3
        and b[0] == 0xFF
        and (b[1] & 0xE0) == 0xE0
        and (b[1] & 0x18) != 0x08  # version: not reserved
        and (b[1] & 0x06) != 0x00  # layer: not reserved
        and (b[2] >> 4) not in (0, 15)  # bitrate: not free/bad
        and ((b[2] >> 2) & 0x3) != 3  # sample rate: not reserved
    ):
        return "mp3"
    return "unknown"


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed BI_RGB, bottom-up rows, 4-byte row padding
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    bgr = arr[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + info + bytes(rows)


@_quarantine
def decode_bmp(b: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB.  Supports the 24-bit BI_RGB
    subset this pipeline produces; anything else raises ValueError."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if flip else rgb


# ---------------------------------------------------------------------------
# PPM — P6 binary, maxval 255
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


@_quarantine
def decode_ppm(b: bytes) -> np.ndarray:
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments unsupported — this codec reads what encode_ppm writes)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    raw = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# WAV — RIFF PCM16
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """int16 samples (flat, interleaved if multichannel) -> WAV bytes."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


@_quarantine
def decode_wav(b: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> (int16 samples, sample_rate, n_channels).

    Real-corpus coverage (r9 — was PCM16-only): integer PCM at
    8 (unsigned) / 16 / 24 / 32 bits, IEEE float32 (fmt 3), and
    WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE, resolved by the SubFormat
    GUID's leading code).  Everything normalizes to the int16 contract
    the downstream kernels consume (shift/scale — the fingerprints are
    gain-invariant, so normalization is lossless for dedup purposes)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = n_channels = None
    audio_fmt = bits = None
    raw = None
    while pos + 8 <= len(b):
        chunk_id = b[pos : pos + 4]
        chunk_len = struct.unpack_from("<I", b, pos + 4)[0]
        body = pos + 8
        if chunk_id == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", b, body)
            if audio_fmt == 0xFFFE:  # EXTENSIBLE: real format in SubFormat GUID
                if chunk_len < 40:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
                audio_fmt = struct.unpack_from("<H", b, body + 24)[0]
            if (audio_fmt, bits) not in (
                (1, 8), (1, 16), (1, 24), (1, 32), (3, 32),
            ):
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
            if n_channels == 0 or sample_rate == 0:
                # zero channels/rate would surface downstream as
                # ZeroDivisionError in the kernels — reject here instead
                raise ValueError("malformed WAV: zero channels or sample rate")
        elif chunk_id == b"data":
            raw = b[body : body + chunk_len]
        pos = body + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    if sample_rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt == 3:  # IEEE float32 in [-1, 1]
        f = np.frombuffer(raw, dtype="<f4", count=len(raw) // 4)
        if not np.all(np.isfinite(f)):
            raise ValueError("non-finite float WAV samples")
        samples = np.clip(f * 32767.0, -32768, 32767).astype(np.int16)
    elif bits == 8:  # unsigned, midpoint 128
        samples = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif bits == 16:
        samples = np.frombuffer(raw, dtype="<i2", count=len(raw) // 2)
    elif bits == 24:  # packed LE triplets, sign-extend then take the top 16
        n = len(raw) // 3
        tri = np.frombuffer(raw, dtype=np.uint8, count=n * 3).reshape(n, 3).astype(np.int32)
        v = tri[:, 0] | (tri[:, 1] << 8) | (tri[:, 2] << 16)
        v = np.where(v & 0x800000, v - (1 << 24), v)
        samples = (v >> 8).astype(np.int16)
    else:  # 32-bit int
        samples = (np.frombuffer(raw, dtype="<i4", count=len(raw) // 4) >> 16).astype(np.int16)
    return samples, sample_rate, n_channels


# ---------------------------------------------------------------------------
# PNG — baseline profile via stdlib zlib: bit depth 8, color types
# 0 (gray) / 2 (RGB) / 4 (gray+alpha) / 6 (RGBA), non-interlaced,
# all five scanline filters.  No third-party codec library involved.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left), int16 in."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


_ADAM7 = [  # (x0, y0, dx, dy) per pass, spec order
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_rows(arr: np.ndarray, filter_type: int) -> bytes:
    """Apply one scanline filter to every row of a (sub-)image; returns
    the filter-byte-prefixed scanline bytes."""
    h, w, ch = arr.shape
    a16 = arr.astype(np.int16)
    left = np.zeros_like(a16)
    left[:, 1:] = a16[:, :-1]
    up = np.zeros_like(a16)
    up[1:] = a16[:-1]
    upleft = np.zeros_like(a16)
    upleft[1:, 1:] = a16[:-1, :-1]
    if filter_type == 0:
        filt = a16
    elif filter_type == 1:
        filt = a16 - left
    elif filter_type == 2:
        filt = a16 - up
    elif filter_type == 3:
        filt = a16 - ((left + up) >> 1)
    elif filter_type == 4:
        filt = a16 - _paeth(left, up, upleft)
    else:
        raise ValueError(f"bad filter_type {filter_type}")
    filt = (filt % 256).astype(np.uint8).reshape(h, w * ch)
    return np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), filt], axis=1
    ).tobytes()


def encode_png(
    arr: np.ndarray,
    filter_type: int = 0,
    compress_level: int = 6,
    interlace: bool = False,
    transparent: tuple | None = None,
) -> bytes:
    """uint8 image -> PNG bytes.  (h, w) or (h, w, 1) -> grayscale,
    (h, w, 2) -> gray+alpha, (h, w, 3) -> RGB, (h, w, 4) -> RGBA.
    ``filter_type`` applies one PNG scanline filter to every row (0-4) —
    handy for exercising every unfilter path in round-trip tests.
    ``interlace`` emits Adam7 (each pass filtered independently, per
    spec).  ``transparent`` (gray/RGB only: a tuple of one/three sample
    values) emits the single-transparent-value tRNS chunk — the fixture
    twin for the gray/RGB alpha-expansion decode path."""
    assert arr.dtype == np.uint8
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    trns_chunk = b""
    if transparent is not None:
        if ch not in (1, 3) or len(transparent) != ch:
            raise ValueError("tRNS encode needs gray/RGB input and one value per sample")
        trns_chunk = _png_chunk(
            b"tRNS", b"".join(struct.pack(">H", int(v) & 0xFF) for v in transparent)
        )
    if interlace:
        raw = b"".join(
            _png_filter_rows(arr[y0::dy, x0::dx], filter_type)
            for x0, y0, dx, dy in _ADAM7
            if arr[y0::dy, x0::dx].size
        )
    else:
        raw = _png_filter_rows(arr, filter_type)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + trns_chunk
        + _png_chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 index plane + (n<=256, 3) palette -> paletted
    (color type 3) PNG — the fixture twin for the PLTE decode path."""
    assert indices.dtype == np.uint8 and palette.ndim == 2 and palette.shape[1] == 3
    if int(indices.max(initial=0)) >= palette.shape[0]:
        raise ValueError("index exceeds palette")
    h, w = indices.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = _png_filter_rows(indices[:, :, None], 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )




def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Unfilter one 8-bit-depth (sub-)image: ``h`` scanlines of 1 filter
    byte + ``w*ch`` samples -> (h, w, ch) uint8."""
    return _png_unfilter_units(raw, w, h, ch)


def _png_unfilter_units(raw: bytes, n_units: int, h: int, bpp: int) -> np.ndarray:
    """Unfilter ``h`` scanlines of 1 filter byte + ``n_units * bpp``
    bytes -> (h, n_units, bpp) uint8.  Per the PNG spec the filters
    operate BYTEWISE with a left-neighbor distance of bpp bytes
    (bpp = ceil(channels * depth / 8), floored at 1) — so one body
    serves every bit depth: 8-bit runs with (w, ch), 16-bit with
    (w, 2*ch), and sub-byte depths with (row_bytes, 1).  All five
    scanline filters."""
    w, ch = n_units, bpp
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError("IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.int16)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].reshape(w, ch).astype(np.int16)
        if ftype == 0:
            recon = line
        elif ftype == 1:  # Sub: prefix sum along x per channel, mod 256
            recon = np.cumsum(line, axis=0, dtype=np.int64) % 256
        elif ftype == 2:  # Up
            recon = (line + prev) % 256
        elif ftype == 3:  # Average: sequential left dependence
            recon = np.zeros_like(line)
            left = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                left = (line[x] + ((left + prev[x]) >> 1)) % 256
                recon[x] = left
        elif ftype == 4:  # Paeth: sequential left dependence
            recon = np.zeros_like(line)
            left = np.zeros(ch, dtype=np.int16)
            upleft = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                left = (line[x] + _paeth(left, prev[x], upleft)) % 256
                recon[x] = left
                upleft = prev[x]
        else:
            raise ValueError(f"bad scanline filter {ftype}")
        prev = recon.astype(np.int16)
        out[y] = recon.astype(np.uint8)
    return out


@_quarantine
def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8.  Color types 0/2/3
    (paletted -> expanded to RGB)/4/6; bit depths 8 (non-interlaced AND
    Adam7), 16 (high byte -> uint8 contract), and 1/2/4 for
    grayscale/paletted (late r9 — old-web icons and photography scans
    are exactly these).  Sub-byte and 16-bit interlaced stay guarded.
    Chunk CRCs are verified; any malformation raises ValueError
    (callers quarantine, never crash)."""
    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte, trns = len(_PNG_SIG), None, [], None, None
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3 or length == 0 or length > 256 * 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    paletted = color_type == 3
    # legal (depth, color) combinations per the spec: sub-byte depths
    # only for grayscale and paletted; 16-bit for everything but palette
    depth_ok = (
        depth == 8
        or (depth == 16 and color_type in (0, 2, 4, 6))
        or (depth in (1, 2, 4) and color_type in (0, 3))
    )
    if (not depth_ok or comp != 0 or filt_method != 0 or interlace not in (0, 1)
            or (color_type not in _PNG_CHANNELS and not paletted)
            or (interlace == 1 and depth != 8)):
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}, interlace={interlace})"
        )
    ch = 1 if paletted else _PNG_CHANNELS[color_type]
    if paletted and plte is None:
        raise ValueError("paletted PNG without PLTE")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"bad IDAT stream: {exc}") from exc
    if depth == 16:
        # filters run bytewise with bpp = 2*ch; the engine contract is
        # uint8, so take each sample's HIGH byte (big-endian per spec —
        # the standard fast 16->8 path, within 1 of round(v/257))
        wide = _png_unfilter_units(raw, w, h, 2 * ch)
        out = wide.reshape(h, w, ch, 2)[:, :, :, 0]
    elif depth in (1, 2, 4):
        row_bytes = (w * depth + 7) // 8
        packed = _png_unfilter_units(raw, row_bytes, h, 1).reshape(h, row_bytes)
        bits = np.unpackbits(packed, axis=1)[:, : w * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        idx = (bits.reshape(h, w, depth) * weights).sum(axis=2).astype(np.uint8)
        if paletted:
            out = idx[:, :, None]
        else:  # grayscale: exact spec scaling (255/(2^d - 1) is integral)
            out = (idx * np.uint8(255 // ((1 << depth) - 1)))[:, :, None]
    elif interlace == 0:
        out = _png_unfilter(raw, w, h, ch)
    else:  # Adam7: 7 independently-filtered sub-images scattered to grid
        out = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            need = ph * (1 + pw * ch)
            sub = _png_unfilter(raw[off : off + need], pw, ph, ch)
            off += need
            out[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("IDAT length mismatch")
    if paletted:
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index out of range")
        if trns is not None:
            # paletted transparency (the old-web PNG staple): tRNS holds
            # per-palette-entry alpha, shorter tables pad opaque (255)
            if trns.shape[0] > plte.shape[0]:
                raise ValueError("tRNS longer than palette")
            alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
            alpha[: trns.shape[0]] = trns
            out = np.concatenate(
                [plte[idx], alpha[idx][:, :, None]], axis=2
            )
        else:
            out = plte[idx]
    elif trns is not None and color_type in (0, 2):
        # gray/RGB tRNS (one transparent sample VALUE, 16-bit BE per
        # sample, least-significant bits used below depth 16) expands to
        # a real alpha channel, same as the paletted path — a
        # transparent background must not decode opaque and pair
        # visually-distinct images in dedup.  At depth 16 the compare
        # runs on the kept HIGH byte (the documented uint8 contract).
        if trns.shape[0] != 2 * ch:
            raise ValueError("bad tRNS length for color type")
        vals = [int(trns[2 * i]) << 8 | int(trns[2 * i + 1]) for i in range(ch)]
        if depth == 16:
            key = [v >> 8 for v in vals]
        else:
            m = (1 << depth) - 1
            key = [(v & m) * (255 // m) for v in vals]
        mask = (out == np.array(key, dtype=np.uint8)).all(axis=2)
        out = np.concatenate(
            [out, np.where(mask, 0, 255).astype(np.uint8)[:, :, None]], axis=2
        )
    return out


# baseline JPEG codec lives in its own module (DCT + huffman entropy
# coding are ~400 lines); re-exported here so callers have one namespace
from esgopeta_spark.operators import jpeg as _jpeg  # noqa: E402

decode_jpeg = _quarantine(_jpeg.decode_jpeg)
encode_jpeg = _jpeg.encode_jpeg
encode_jpeg_progressive = _jpeg.encode_jpeg_progressive

# FLAC lossless audio lives in its own module (bit-level Rice/LPC machinery);
# same one-namespace re-export + quarantine as JPEG
from esgopeta_spark.operators import flac as _flac  # noqa: E402

decode_flac = _quarantine(_flac.decode_flac)
encode_flac = _flac.encode_flac


def to_rgb(arr: np.ndarray) -> np.ndarray:
    """Normalize a decoded image to (h, w, 3) RGB: replicate gray,
    drop alpha."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    ch = arr.shape[2]
    if ch == 1:
        return np.repeat(arr, 3, axis=2)
    if ch == 2:  # gray + alpha
        return np.repeat(arr[:, :, :1], 3, axis=2)
    if ch == 4:
        return arr[:, :, :3]
    return arr


# ---------------------------------------------------------------------------
# resize — nearest + bilinear, pure numpy
# ---------------------------------------------------------------------------


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    # align-corners=False sampling grid (the conventional choice)
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.floor(ys).astype(np.int64).clip(0, h - 1)
    x0 = np.floor(xs).astype(np.int64).clip(0, w - 1)
    y1 = (y0 + 1).clip(0, h - 1)
    x1 = (x0 + 1).clip(0, w - 1)
    wy = (ys - y0).clip(0.0, 1.0)[:, None, None]
    wx = (xs - x0).clip(0.0, 1.0)[None, :, None]
    a = arr.astype(np.float64)
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.round(out).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# GIF — 87a/89a single-frame decode (global/local color tables, interlace,
# extension skipping) + exact-palette encode, both around a from-scratch
# variable-width LZW.  Completes the web image set (PNG/JPEG/GIF/BMP)
# with no codec library.  Animation frames beyond the first and
# transparency compositing are out of scope: frame 1 as RGB.
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width (LSB-first), clear/end codes,
    dictionary capped at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = fresh()
    out = bytearray()
    prev: bytes | None = None
    pos, nbits = 0, len(data) * 8
    while pos + width <= nbits:
        byte_pos, bit_off = pos >> 3, pos & 7
        code = (int.from_bytes(data[byte_pos : byte_pos + 3], "little") >> bit_off) & (
            (1 << width) - 1
        )
        pos += width
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW code beyond table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        # "early change": the decoder's appends lag the encoder's defines by
        # exactly one code (no append after the first code of a run), so it
        # must widen when the table reaches 2^width - 1, one slot early —
        # the convention every GIF writer assumes
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    cur, nbits = 0, 0

    def emit(code: int, w: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # mirror the decoder's append-then-bump: it widens as soon as
            # its table length hits 2^width, BEFORE reading the next code
            if next_code == (1 << width) and width < 12:
                width += 1
        else:  # dictionary full: reset, decoder mirrors on the clear code
            emit(clear, width)
            table, next_code, width = fresh()
        w = bytes([k])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with <= 256 distinct colors -> single-frame
    GIF89a.  The palette is the exact color set (lexicographically
    sorted, deterministic); quantization of richer images is a modeling
    choice left to the caller."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"encode_gif needs <=256 distinct colors, got {len(palette)}")
    # GCT size field: 2^(n+1) entries, at least 4 (min_code_size >= 2)
    n_field = max(1, int(len(palette) - 1).bit_length() - 1) if len(palette) > 2 else 1
    while (2 << n_field) < len(palette):
        n_field += 1
    gct_entries = 2 << n_field
    gct = palette.tobytes() + b"\x00" * (3 * (gct_entries - len(palette)))
    min_code_size = max(2, n_field + 1)
    lzw = _gif_lzw_encode(inverse.astype(np.uint8).tobytes(), min_code_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | (n_field << 4) | n_field, 0, 0])  # GCT flag + sizes
        + gct
        + b"\x2c" + b"\x00" * 4  # image descriptor at (0,0)
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00"  # no LCT, not interlaced
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x00\x3b"  # block terminator + trailer
    )


def encode_gif_animation(
    screen_w: int,
    screen_h: int,
    patches: list,
    bg_color=(0, 0, 0),
) -> bytes:
    """Multi-frame GIF89a builder (the fixture twin of
    ``decode_gif_frames``).  ``patches`` is a list of dicts per frame:

    - ``img``: (h, w, 3) uint8 RGB patch
    - ``left``/``top``: position on the logical screen (default 0)
    - ``disposal``: 0/1 keep, 2 restore-background, 3 restore-previous
    - ``transparent``: an RGB tuple within ``img`` whose pixels are
      marked transparent via the graphic control extension, or None

    One GLOBAL palette holds the union of all patch colors plus the
    background (<= 256 total; ValueError otherwise), like the
    single-frame encoder: exact colors, deterministic order."""
    colors = {tuple(bg_color)}
    for p in patches:
        arr = p["img"]
        assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
        colors.update(map(tuple, arr.reshape(-1, 3)))
        if p.get("transparent") is not None:
            colors.add(tuple(p["transparent"]))  # must own a palette slot
    palette = sorted(colors)
    if len(palette) > 256:
        raise ValueError(f"animation needs <=256 distinct colors, got {len(palette)}")
    index_of = {c: i for i, c in enumerate(palette)}
    n_field = 1
    while (2 << n_field) < len(palette):
        n_field += 1
    gct_entries = 2 << n_field
    gct = b"".join(bytes(c) for c in palette) + b"\x00" * (3 * (gct_entries - len(palette)))
    min_code_size = max(2, n_field + 1)

    out = bytearray(b"GIF89a")
    out += screen_w.to_bytes(2, "little") + screen_h.to_bytes(2, "little")
    out += bytes([0x80 | (n_field << 4) | n_field, index_of[tuple(bg_color)], 0])
    out += gct
    for p in patches:
        arr = p["img"]
        h, w = arr.shape[:2]
        left, top = int(p.get("left", 0)), int(p.get("top", 0))
        disposal = int(p.get("disposal", 0))
        transparent = p.get("transparent")
        t_idx = index_of[tuple(transparent)] if transparent is not None else 0
        gce_packed = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gce_packed, 0, 0, t_idx, 0])
        idx = np.array(
            [index_of[tuple(px)] for px in arr.reshape(-1, 3)], dtype=np.uint8
        )
        lzw = _gif_lzw_encode(idx.tobytes(), min_code_size)
        out += b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
        out += bytes([min_code_size])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _gif_image_at(b: bytes, pos: int, gct, screen_w: int, screen_h: int):
    """Decode one image block (descriptor at b[pos]) -> (idx array, ct,
    left, top, w, h, new pos).  Shared by single-frame and animation
    decode; honors local color tables, interlace, and screen bounds."""
    if pos + 9 > len(b):
        raise ValueError("truncated image descriptor")
    left = int.from_bytes(b[pos : pos + 2], "little")
    top = int.from_bytes(b[pos + 2 : pos + 4], "little")
    w = int.from_bytes(b[pos + 4 : pos + 6], "little")
    h = int.from_bytes(b[pos + 6 : pos + 8], "little")
    if left + w > screen_w or top + h > screen_h:
        raise ValueError("GIF frame exceeds logical screen bounds")
    ipacked = b[pos + 8]
    pos += 9
    ct = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        ct = np.frombuffer(b, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    if ct is None:
        raise ValueError("GIF frame has no color table")
    if pos >= len(b):
        raise ValueError("truncated GIF image data")
    min_code_size = b[pos]
    pos += 1
    if not 2 <= min_code_size <= 11:
        raise ValueError("bad LZW min code size")
    data = bytearray()
    while pos < len(b) and b[pos] != 0:
        ln = b[pos]
        data += b[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    pos += 1
    idx = np.frombuffer(_gif_lzw_decode(bytes(data), min_code_size), np.uint8)
    if len(idx) < w * h:
        raise ValueError("truncated GIF pixel data")
    idx = idx[: w * h].reshape(h, w)
    if idx.max(initial=0) >= len(ct):
        raise ValueError("palette index out of range")
    if ipacked & 0x40:  # interlaced: 4-pass row order
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        de = np.empty_like(idx)
        de[order] = idx
        idx = de
    return idx, ct, left, top, w, h, pos


@_quarantine
def decode_gif_frames(b: bytes, max_frames: int | None = None) -> list:
    """GIF87a/89a bytes -> list of (screen_h, screen_w, 3) uint8 RGB
    frames, composited per GIF89a animation semantics: graphic-control
    transparency (transparent pixels leave the canvas untouched) and
    disposal methods 0/1 (keep), 2 (restore background), 3 (restore
    previous).  Each returned frame is what a viewer displays at that
    step — the per-frame decode for the ``frame_sample`` multimodal path
    (GIF analog of decode_mjpeg_frames).  Left/top offsets composite
    into the logical screen (r4 ADVICE); the background index reads the
    GLOBAL color table only."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    pos = 6
    screen_w = int.from_bytes(b[pos : pos + 2], "little")
    screen_h = int.from_bytes(b[pos + 2 : pos + 4], "little")
    pos += 4
    packed = b[pos]
    bg_index = b[pos + 1]
    pos += 3  # packed, bg color, aspect
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg = gct[bg_index] if gct is not None and bg_index < len(gct) else np.zeros(3, np.uint8)
    if screen_w * screen_h > 64_000_000:
        # memory quarantine: a forged header must not allocate a 12 GB
        # canvas before any frame validates (stock decoders cap likewise)
        raise ValueError(f"GIF logical screen too large: {screen_w}x{screen_h}")
    canvas = None  # allocated after the FIRST image block validates
    frames: list = []
    transparency: int | None = None
    disposal = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            if pos >= len(b):
                raise ValueError("truncated GIF extension")
            label = b[pos]
            pos += 1
            if label == 0xF9 and pos < len(b) and b[pos] == 4 and pos + 5 <= len(b):
                gce_packed = b[pos + 1]
                transparency = b[pos + 4] if gce_packed & 0x01 else None
                disposal = (gce_packed >> 2) & 0x07
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        idx, ct, left, top, w, h, pos = _gif_image_at(b, pos, gct, screen_w, screen_h)
        if canvas is None:
            canvas = np.tile(bg.astype(np.uint8), (screen_h, screen_w, 1))
        # total-output budget: a tiny payload declaring a huge screen and
        # hundreds of 1x1 frames must not OOM via frames.append(copy) —
        # same quarantine rationale as the single-canvas cap above
        if (len(frames) + 1) * screen_w * screen_h > 256_000_000:
            raise ValueError("GIF animation exceeds the decoded-pixel budget")
        snapshot = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        pixels = ct[idx]
        if transparency is not None:
            mask = idx != transparency
            region[mask] = pixels[mask]
        else:
            region[:] = pixels
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if disposal == 2:  # restore the frame rect to background
            canvas[top : top + h, left : left + w] = bg
        elif disposal == 3 and snapshot is not None:
            canvas = snapshot
        transparency = None  # a GCE governs exactly one image
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames


@_quarantine
def decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a bytes -> (h, w, 3) uint8 RGB of the FIRST displayed
    frame (the animation walker truncated at one frame)."""
    return decode_gif_frames.__wrapped__(b, max_frames=1)[0]


# ---------------------------------------------------------------------------
# TIFF — baseline 6.0 subset: both byte orders (II/MM), 8-bit gray
# (photometric 0/1) and RGB, strip layout (single or multi-strip),
# Compression 1 (none), 5 (LZW, spec early-change) and 32773 (PackBits),
# Predictor 1/2 (horizontal differencing).  The scanned-document format
# real corpora still ship; tiles and other photometrics/compressions
# raise ValueError (quarantined like everything here).
# ---------------------------------------------------------------------------


def _packbits_encode(row: bytes) -> bytes:
    """Apple PackBits RLE (public, TIFF spec section 9), one row."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(row[i])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and row[i + 1] == row[i] and (i + 2 < n and row[i + 2] == row[i]))
        ):
            i += 1
        out.append(i - lit - 1)
        out += row[lit:i]
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("PackBits literal overruns strip")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("PackBits run overruns strip")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("PackBits output length mismatch")
    return bytes(out)


def _tiff_lzw_encode(data: bytes, early_change: bool = True) -> bytes:
    """TIFF LZW (spec section 13): MSB-first variable-width codes,
    Clear=256 / EOI=257, table growth from 258, EARLY code-width change
    (width bumps when the NEXT code to be written reaches 2^w - 1).
    PDF's /LZWDecode (ISO 32000-1 §7.4.4) is the SAME algorithm —
    ``early_change=False`` emits the /EarlyChange 0 dialect (the bump
    deferred one code, 2^w)."""
    out = bytearray()
    acc = 0
    nbits = 0
    bump = -1 if early_change else 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # leading Clear per spec
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        put(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) + bump and width < 12:
            width += 1
        if next_code >= 4094:
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        put(table[w], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(
    data: bytes, expected: int | None, early_change: bool = True
) -> bytes:
    """Inverse of _tiff_lzw_encode, bounded by ``expected`` output bytes.
    ``expected=None`` (the PDF /LZWDecode caller — content streams don't
    declare their decoded length) decodes until EOI or clean bit
    exhaustion; ``early_change=False`` reads the /EarlyChange 0 dialect."""
    out = bytearray()
    pos = 0  # bit position
    bump = -2 if early_change else -1

    def get(width: int) -> int:
        nonlocal pos
        v = 0
        for _ in range(width):
            byte = pos >> 3
            if byte >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            v = (v << 1) | ((data[byte] >> (7 - (pos & 7))) & 1)
            pos += 1
        return v

    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while expected is None or len(out) < expected:
        if expected is None:
            rem = len(data) * 8 - pos
            if rem < width:
                break  # clean exhaustion: a missing EOI is tolerated
            if rem <= (width - 1) + 7:
                # final-code width skew: the encoder never registers a
                # table entry after its LAST data code, so when that
                # registration would have crossed the width boundary the
                # decoder (which registers one code later) sits one bit
                # wide of the encoder's EOI.  Only one code fits here;
                # peek it at width-1 — EOI followed by zero padding is
                # unambiguous (a data code at full width cannot leave
                # this few bits before its own EOI).
                save = pos
                peek = get(width - 1)
                tail_zero = all(
                    (data[p >> 3] >> (7 - (p & 7))) & 1 == 0
                    for p in range(pos, len(data) * 8)
                )
                if peek == 257 and tail_zero:
                    break
                pos = save
        code = get(width)
        if code == 257:  # EOI
            break
        if code == 256:  # Clear
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # early change mirrors the encoder: the decoder's table lags the
        # encoder's next_code by ONE entry (the encoder registers w+c as
        # it emits; the decoder registers on the NEXT code), so the bump
        # point is 2^w - 2 here vs the encoder's 2^w - 1 (one later each
        # under /EarlyChange 0)
        if len(table) == (1 << width) + bump and width < 12:
            width += 1
    if expected is not None and len(out) < expected:
        raise ValueError("TIFF LZW output shorter than strip")
    return bytes(out[:expected]) if expected is not None else bytes(out)


def encode_tiff(
    arr: np.ndarray,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    lzw: bool = False,
    predictor: bool = False,
) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> baseline TIFF bytes.
    ``lzw`` selects Compression 5 (mutually exclusive with packbits);
    ``predictor`` applies horizontal differencing (tag 317 = 2, the
    standard LZW companion) before compression."""
    assert arr.dtype == np.uint8
    if packbits and lzw:
        raise ValueError("pick one of packbits/lzw")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        block = arr[y0 : y0 + rps]
        if predictor:  # horizontal differencing per row, per channel
            bi = block.reshape(block.shape[0], w, spp).astype(np.int16)
            d = bi.copy()
            d[:, 1:, :] = (bi[:, 1:, :] - bi[:, :-1, :]) % 256
            block = d.astype(np.uint8).reshape(block.shape)
        raw = block.tobytes()
        if packbits:
            rows = [block[i].tobytes() for i in range(block.shape[0])]
            raw = b"".join(_packbits_encode(r) for r in rows)
        elif lzw:
            raw = _tiff_lzw_encode(raw)
        strips.append(raw)
    n_strips = len(strips)

    def entry(tag, typ, count, value_bytes):
        return struct.pack(f"{e}HHI", tag, typ, count) + value_bytes

    # layout: 8-byte header, IFD, extra arrays, strip data
    n_entries = 10
    ifd_size = 2 + n_entries * 12 + 4
    extra_off = 8 + ifd_size
    extra = bytearray()

    def short_val(v):
        return struct.pack(f"{e}HH", v, 0)

    def long_val(v):
        return struct.pack(f"{e}I", v)

    if gray:
        bps_val = short_val(8)
        bps_entry = (258, 3, 1, bps_val)
    else:
        bps_entry = (258, 3, 3, long_val(extra_off + len(extra)))
        extra += struct.pack(f"{e}HHH", 8, 8, 8)
    if n_strips == 1:
        so_entry_placeholder = (273, 4, 1, None)
        sbc_entry = (279, 4, 1, long_val(len(strips[0])))
    else:
        so_entry_placeholder = (273, 4, n_strips, None)
        sbc_entry = (279, 4, n_strips, long_val(extra_off + len(extra)))
        extra += b"".join(struct.pack(f"{e}I", len(sdat)) for sdat in strips)
    # strip offsets array (needs data start): reserve extra space now
    if n_strips > 1:
        so_arr_off = extra_off + len(extra)
        extra += b"\x00" * (4 * n_strips)
    data_off = extra_off + len(extra)
    offs = []
    pos = data_off
    for sdat in strips:
        offs.append(pos)
        pos += len(sdat)
    if n_strips == 1:
        so_entry = (273, 4, 1, long_val(offs[0]))
    else:
        so_entry = (273, 4, n_strips, long_val(so_arr_off))
        extra[so_arr_off - extra_off : so_arr_off - extra_off + 4 * n_strips] = b"".join(
            struct.pack(f"{e}I", o) for o in offs
        )
    entries = sorted(
        [
            (256, 3, 1, short_val(w)),
            (257, 3, 1, short_val(h)),
            bps_entry,
            (259, 3, 1, short_val(32773 if packbits else (5 if lzw else 1))),
            (262, 3, 1, short_val(1 if gray else 2)),  # BlackIsZero / RGB
            so_entry,
            (277, 3, 1, short_val(spp)),
            (278, 3, 1, short_val(min(rps, h))),
            sbc_entry,
            (317, 3, 1, short_val(2 if predictor else 1)),
        ]
    )
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(f"{e}I", 8)
    out += struct.pack(f"{e}H", n_entries)
    for tag, typ, count, vb in entries:
        out += entry(tag, typ, count, vb)
    out += struct.pack(f"{e}I", 0)  # next IFD
    out += extra
    for sdat in strips:
        out += sdat
    return bytes(out)


@_quarantine
def decode_tiff(b: bytes) -> np.ndarray:
    """Baseline TIFF -> (h, w, 3) RGB or (h, w) gray uint8.  Supports
    II/MM, 8-bit gray (photometric 0 min-is-white inverted, 1) and RGB,
    strips, Compression 1/5 (LZW, early-change)/32773 (PackBits) with
    Predictor 1/2 (horizontal differencing); anything else raises
    ValueError."""
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(f"{e}I", b, 4)
    (n_entries,) = struct.unpack_from(f"{e}H", b, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(f"{e}HHI", b, off)
        (raw,) = struct.unpack_from(f"{e}I", b, off + 8)
        tags[tag] = (typ, count, off + 8, raw)

    def values(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing TIFF tag {tag}")
            return default
        typ, count, vpos, raw = tags[tag]
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            raise ValueError(f"unsupported TIFF tag type {typ}")
        total = size * count
        base = vpos if total <= 4 else raw
        if base + total > len(b):
            raise ValueError("TIFF tag data out of bounds")
        fmt = "H" if typ == 3 else "I"
        return list(struct.unpack_from(f"{e}{count}{fmt}", b, base))

    w = values(256)[0]
    h = values(257)[0]
    comp = values(259, [1])[0]
    photo = values(262)[0]
    spp = values(277, [1])[0]
    bps = values(258, [8])
    rps = values(278, [h])[0] or h
    offs = values(273)
    counts = values(279)
    pred = values(317, [1])[0]
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if pred not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {pred}")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if any(v != 8 for v in bps) or spp not in (1, 3):
        raise ValueError("only 8-bit gray/RGB TIFF supported")
    if (photo == 2) != (spp == 3):
        raise ValueError("TIFF photometric/samples mismatch")
    if w <= 0 or h <= 0 or w * h > (1 << 26):
        raise ValueError("bad TIFF dimensions")
    if len(offs) != len(counts):
        raise ValueError("strip offsets/counts mismatch")
    raw = bytearray()
    rows_done = 0
    for si, (o, c) in enumerate(zip(offs, counts)):
        if o + c > len(b):
            raise ValueError("TIFF strip out of bounds")
        strip_rows = min(rps, h - rows_done)
        expected = strip_rows * w * spp
        data = bytes(b[o : o + c])
        if comp == 32773:
            chunk = _packbits_decode(data, expected)
        elif comp == 5:
            chunk = _tiff_lzw_decode(data, expected)
        else:
            chunk = data
            if c < expected:
                raise ValueError("truncated TIFF strip")
        if pred == 2:  # undo horizontal differencing per row/channel
            a2_ = np.frombuffer(chunk, dtype=np.uint8, count=expected)
            a2_ = a2_.reshape(strip_rows, w, spp).astype(np.uint32)
            chunk = (np.cumsum(a2_, axis=1) % 256).astype(np.uint8).tobytes()
        raw += chunk
        rows_done += strip_rows
    if rows_done < h or len(raw) < h * w * spp:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8, count=h * w * spp)
    arr = arr.reshape(h, w, spp) if spp == 3 else arr.reshape(h, w)
    if photo == 0:  # min-is-white
        arr = 255 - arr
    return arr


# ---------------------------------------------------------------------------
# Compressed-container METADATA parsers — mp4 (ISO BMFF box walk) and mp3
# (frame-header scan).  Pipelines routinely need duration/dims for corpus
# stats and filtering long before any sample decode; these read the
# container structure only.  (MPEG-1 audio samples — all three layers —
# decode for real via decode_mpeg1_audio below; mp4 h264/hevc sample
# decode stays behind the needs-codec guard.)
# ---------------------------------------------------------------------------


@_quarantine
def parse_mp4_meta(b: bytes) -> dict:
    """Walk top-level ISO BMFF boxes; pull duration from moov/mvhd and
    track dims from the first moov/trak/tkhd.  Returns
    {duration_ms, width, height} (dims None for audio-only)."""

    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    raise ValueError("truncated mp4 largesize box")
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                hdr = 16
            else:
                hdr = 8
            if size == 0:  # box extends to end of file
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("malformed mp4 box size")
            yield btype, pos + hdr, pos + size
            pos += size

    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (mp4) payload")
    duration_ms = width = height = None
    for btype, s, e in boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in boxes(b, s, e):
            if ctype == b"mvhd" and ce - cs >= 20:
                ver = b[cs]
                if ver == 1 and ce - cs < 32:
                    # a version-1 mvhd reads through cs+32; a shorter box
                    # would silently slice into sibling-box bytes and
                    # fabricate a duration
                    raise ValueError("truncated version-1 mvhd box")
                if ver == 1:
                    timescale = int.from_bytes(b[cs + 20 : cs + 24], "big")
                    duration = int.from_bytes(b[cs + 24 : cs + 32], "big")
                else:
                    timescale = int.from_bytes(b[cs + 12 : cs + 16], "big")
                    duration = int.from_bytes(b[cs + 16 : cs + 20], "big")
                if timescale:
                    duration_ms = duration * 1000 // timescale
            elif ctype == b"trak" and width is None:
                for ttype, ts, te in boxes(b, cs, ce):
                    if ttype == b"tkhd" and te - ts >= 84:
                        # width/height: 16.16 fixed point, last 8 bytes
                        w = int.from_bytes(b[te - 8 : te - 4], "big") >> 16
                        h = int.from_bytes(b[te - 4 : te], "big") >> 16
                        if w and h:
                            width, height = w, h
    if duration_ms is None:
        raise ValueError("mp4 has no moov/mvhd (metadata not present)")
    return {"duration_ms": duration_ms, "width": width, "height": height}


_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]  # V1 L3
_MP3_RATES = [44100, 48000, 32000]


@_quarantine
def parse_id3_tags(b: bytes) -> dict:
    """ID3v2.2/2.3/2.4 TEXT frames -> {title, artist, album, year, genre}
    (None where absent) — the descriptive metadata an audio corpus
    catalogs alongside parse_mp3_meta's technical fields.  Reads the
    syncsafe tag size, skips the extended header when flagged, walks
    6-byte (v2.2) or 10-byte (v2.3/2.4) frame headers, and decodes the
    four standard text encodings (latin-1, utf-16 BOM/BE, utf-8).
    Undecodable text or a malformed frame raises ValueError (quarantine
    contract); payloads without an ID3v2 tag, with an unknown tag
    version, or with the unsynchronisation flag set return all-None
    rather than failing or mis-walking, so the kernel runs on mixed
    corpora (Spark surface: operators/multimodal.extract_audio_tags)."""
    out = {"title": None, "artist": None, "album": None, "year": None, "genre": None}
    if b[:3] != b"ID3" or len(b) < 10:
        return out
    major = b[3]
    flags = b[5]
    size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
    end = min(len(b), 10 + size)
    pos = 10
    if major not in (2, 3, 4) or flags & 0x80:
        # unknown tag version or unsynchronised content: degrade to
        # all-None rather than mis-walking the frames (mixed-corpus
        # promise in the docstring)
        return out
    if flags & 0x40 and major >= 3:  # extended header: skip it
        if pos + 4 > end:
            return out
        ext = int.from_bytes(b[pos : pos + 4], "big")
        if major >= 4:  # v2.4: syncsafe, size INCLUDES the 4 size bytes
            ext = (b[pos] << 21) | (b[pos + 1] << 14) | (b[pos + 2] << 7) | b[pos + 3]
            pos += ext
        else:  # v2.3: size EXCLUDES the 4 size bytes
            pos += 4 + ext
    hdr_len = 6 if major == 2 else 10
    wanted = {
        b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
        b"TYER": "year", b"TDRC": "year", b"TCON": "genre",
        # v2.2 three-character ids
        b"TT2": "title", b"TP1": "artist", b"TAL": "album",
        b"TYE": "year", b"TCO": "genre",
    }
    while pos + hdr_len <= end:
        if major == 2:
            fid = b[pos : pos + 3]
            if fid == b"\x00\x00\x00":
                break  # padding
            fsz = int.from_bytes(b[pos + 3 : pos + 6], "big")
        else:
            fid = b[pos : pos + 4]
            if fid == b"\x00\x00\x00\x00":
                break  # padding
            if major >= 4:  # v2.4: syncsafe frame sizes
                fsz = (b[pos + 4] << 21) | (b[pos + 5] << 14) | (b[pos + 6] << 7) | b[pos + 7]
            else:
                fsz = int.from_bytes(b[pos + 4 : pos + 8], "big")
        body = b[pos + hdr_len : pos + hdr_len + fsz]
        if len(body) != fsz:
            raise ValueError("truncated ID3 frame")
        key = wanted.get(fid)
        if key is not None and body:
            enc = body[0]
            text = body[1:]
            try:
                if enc == 0:
                    val = text.decode("latin-1")
                elif enc == 1:
                    val = text.decode("utf-16")
                elif enc == 2:
                    val = text.decode("utf-16-be")
                elif enc == 3:
                    val = text.decode("utf-8")
                else:
                    raise ValueError(f"bad ID3 text encoding {enc}")
            except UnicodeDecodeError as exc:
                raise ValueError(f"undecodable ID3 text frame: {exc}") from exc
            out[key] = val.rstrip("\x00") or None
        pos += hdr_len + fsz
    return out


@_quarantine
def parse_mp3_meta(b: bytes) -> dict:
    """Skip any ID3v2 tag, find the first MPEG-1 Layer III frame header,
    and derive duration: from the Xing/Info or VBRI header's frame count
    when present (the VBR case — r4 ADVICE: the CBR formula is
    confidently wrong there), else from the audio byte count at the
    header's bitrate (exact for CBR).  Returns {sample_rate,
    bitrate_kbps, duration_ms, is_vbr, is_cbr_estimate} —
    ``is_cbr_estimate`` lets downstream corpus filters discount
    durations that came from the single-header assumption."""
    from esgopeta_spark.operators.mpeg1_audio import skip_id3v2

    pos = skip_id3v2(b)  # synchsafe size + v2.4 footer flag
    end = min(len(b), pos + 4096)  # sync must appear near the front
    while pos + 4 <= end:
        h = b[pos : pos + 4]
        if (
            h[0] == 0xFF
            and (h[1] & 0xE0) == 0xE0
            and (h[1] & 0x18) == 0x18  # MPEG-1
            and (h[1] & 0x06) == 0x02  # Layer III
            and (h[2] >> 4) not in (0, 15)
            and ((h[2] >> 2) & 0x03) != 3
        ):
            bitrate = _MP3_BITRATES[h[2] >> 4]
            rate = _MP3_RATES[(h[2] >> 2) & 0x03]
            # MPEG-1 Layer III: 1152 samples per frame; side info is 32
            # bytes (17 for mono, channel mode bits 11 in byte 3)
            n_frames = None
            is_vbr = False
            side = 17 if (h[3] >> 6) == 3 else 32  # mono -> 17
            xing_off = pos + 4 + side
            tag = b[xing_off : xing_off + 4]
            if tag in (b"Xing", b"Info"):
                # 'Xing' marks VBR; 'Info' is LAME's marker for CBR files
                # carrying the same frame-count header — duration is exact
                # either way, but only Xing means variable bitrate
                is_vbr = tag == b"Xing"
                flags = int.from_bytes(b[xing_off + 4 : xing_off + 8], "big")
                if flags & 0x1 and len(b) >= xing_off + 12:
                    n_frames = int.from_bytes(b[xing_off + 8 : xing_off + 12], "big")
            vbri_off = pos + 4 + 32  # VBRI sits at a fixed 32-byte offset
            if n_frames is None and b[vbri_off : vbri_off + 4] == b"VBRI":
                if len(b) >= vbri_off + 18:
                    n_frames = int.from_bytes(b[vbri_off + 14 : vbri_off + 18], "big")
                    is_vbr = True
            if n_frames is not None:
                return {
                    "sample_rate": rate,
                    "bitrate_kbps": bitrate,
                    "duration_ms": n_frames * 1152 * 1000 // rate,
                    "is_vbr": is_vbr,
                    "is_cbr_estimate": False,
                }
            audio_bytes = len(b) - pos
            return {
                "sample_rate": rate,
                "bitrate_kbps": bitrate,
                "duration_ms": audio_bytes * 8 // bitrate,
                "is_vbr": False,
                "is_cbr_estimate": True,
            }
        pos += 1
    raise ValueError("no MPEG-1 Layer III frame sync found")


def encode_mp4_stub(duration_ms: int, width: int | None = None, height: int | None = None) -> bytes:
    """Minimal structurally-valid ISO BMFF: ftyp + moov(mvhd[, trak/tkhd])
    + empty mdat.  Carries REAL metadata for parse_mp4_meta; contains no
    codec samples (decode stays needs-codec) — the test/fixture twin."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    mvhd = box(
        b"mvhd",
        bytes(12)  # version/flags, ctime, mtime
        + (1000).to_bytes(4, "big")  # timescale: ms
        + int(duration_ms).to_bytes(4, "big")
        + bytes(80),  # rate/volume/matrix/next-track boilerplate
    )
    moov_payload = mvhd
    if width and height:
        tkhd = box(
            b"tkhd",
            bytes(76) + (int(width) << 16).to_bytes(4, "big") + (int(height) << 16).to_bytes(4, "big"),
        )
        moov_payload += box(b"trak", tkhd)
    return (
        box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
        + box(b"moov", moov_payload)
        + box(b"mdat", b"")
    )


def encode_id3v2(tags: dict, major: int = 3) -> bytes:
    """A standalone ID3v2.3/2.4 tag with utf-8 (v2.4) or utf-16 (v2.3)
    TEXT frames — the fixture twin of ``parse_id3_tags``.  Keys:
    title/artist/album/year/genre."""
    frame_ids = {"title": b"TIT2", "artist": b"TPE1", "album": b"TALB",
                 "year": b"TDRC" if major >= 4 else b"TYER", "genre": b"TCON"}
    body = bytearray()
    for key, val in tags.items():
        fid = frame_ids[key]
        if major >= 4:
            payload = b"\x03" + str(val).encode("utf-8")
        else:
            payload = b"\x01" + str(val).encode("utf-16")
        sz = len(payload)
        if major >= 4:  # syncsafe
            szb = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
        else:
            szb = sz.to_bytes(4, "big")
        body += fid + szb + b"\x00\x00" + payload
    total = len(body)
    hdr = b"ID3" + bytes([major, 0, 0]) + bytes(
        [(total >> 21) & 0x7F, (total >> 14) & 0x7F, (total >> 7) & 0x7F, total & 0x7F]
    )
    return hdr + bytes(body)


def encode_mp3_stub(
    duration_ms: int, bitrate_kbps: int = 128, sample_rate: int = 44100, tags: dict | None = None
) -> bytes:
    """ID3v2 header (optionally carrying real text frames) + one valid
    MPEG-1 Layer III frame header + padding sized so the CBR duration
    estimate equals ``duration_ms``."""
    bidx = _MP3_BITRATES.index(bitrate_kbps)
    ridx = _MP3_RATES.index(sample_rate)
    hdr = bytes([0xFF, 0xFB, (bidx << 4) | (ridx << 2), 0x00])
    audio_bytes = duration_ms * bitrate_kbps // 8
    id3 = encode_id3v2(tags) if tags else b"ID3\x04\x00\x00\x00\x00\x00\x00"
    return id3 + hdr + bytes(max(0, audio_bytes - 4))


def encode_mjpeg_mp4(frames: list, fps: int = 10, quality: int = 85) -> bytes:
    """Motion-JPEG in ISO BMFF: each video sample is an independent
    baseline JPEG (encoded by our from-scratch codec), indexed by a real
    sample table (stsd 'jpeg', stts/stsc/stsz/stco).  The test/fixture
    twin of ``decode_mjpeg_frames``; one chunk holding all samples."""
    if not frames:
        raise ValueError("need at least one frame")

    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    h, w = frames[0].shape[:2]
    n = len(jpegs)
    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isomiso2")
    mdat_payload = b"".join(jpegs)
    chunk_offset = len(ftyp) + 8  # first sample = start of mdat payload
    duration_ms = n * 1000 // fps

    stsd_entry = box(
        b"jpeg",
        bytes(6) + (1).to_bytes(2, "big")  # reserved + data_reference_index
        + bytes(16)  # pre_defined/reserved
        + int(w).to_bytes(2, "big") + int(h).to_bytes(2, "big")
        + bytes(50),  # resolution/frame_count/compressorname/depth boilerplate
    )
    stsd = box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + stsd_entry)
    stts = box(b"stts", bytes(4) + (1).to_bytes(4, "big")
               + n.to_bytes(4, "big") + (1000 // fps).to_bytes(4, "big"))
    stsc = box(b"stsc", bytes(4) + (1).to_bytes(4, "big")
               + (1).to_bytes(4, "big") + n.to_bytes(4, "big") + (1).to_bytes(4, "big"))
    stsz = box(b"stsz", bytes(4) + (0).to_bytes(4, "big") + n.to_bytes(4, "big")
               + b"".join(len(j).to_bytes(4, "big") for j in jpegs))
    stco = box(b"stco", bytes(4) + (1).to_bytes(4, "big") + chunk_offset.to_bytes(4, "big"))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdhd = box(b"mdhd", bytes(12) + (1000).to_bytes(4, "big")
               + duration_ms.to_bytes(4, "big") + bytes(4))
    hdlr = box(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = box(b"tkhd", bytes(76) + (int(w) << 16).to_bytes(4, "big")
               + (int(h) << 16).to_bytes(4, "big"))
    mvhd = box(b"mvhd", bytes(12) + (1000).to_bytes(4, "big")
               + duration_ms.to_bytes(4, "big") + bytes(80))
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + box(b"mdat", mdat_payload) + moov


@_quarantine
def decode_mjpeg_frames(b: bytes, max_frames: int | None = None) -> list:
    """REAL video frame decode for the Motion-JPEG subset: walk the ISO
    BMFF sample tables (stsd/stsz/stco/stsc), slice each sample out of
    mdat, and decode it with the from-scratch JPEG codec.  Raises
    ValueError for non-MJPEG codecs (h264/hevc stay behind the
    needs-codec guard) and for any malformed table.  Scans every trak
    (real files often list audio first), honors the stsc run-length
    sample-to-chunk table, and bounds every declared count by the
    payload size before materializing anything — a poison count must
    quarantine as ValueError, never allocate."""

    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(buf[pos : pos + 4], "big")
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
                hdr = 16
            if size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("malformed mp4 box size")
            yield btype, pos + hdr, pos + size
            pos += size

    def find(path: list, start: int, end: int):
        t = path[0]
        for btype, s, e in boxes(b, start, end):
            if btype == t:
                return (s, e) if len(path) == 1 else find(path[1:], s, e)
        raise ValueError(f"mp4 missing box {t!r}")

    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (mp4) payload")
    moov_s, moov_e = find([b"moov"], 0, len(b))
    # scan EVERY trak: real MJPEG files often list an audio trak first,
    # so "first trak" would reject decodable video.  Pick the trak whose
    # sample description is the 'jpeg' codec.
    tables = None
    seen_codecs = []
    for btype, ts, te in boxes(b, moov_s, moov_e):
        if btype != b"trak":
            continue
        try:
            stbl_s, stbl_e = find([b"mdia", b"minf", b"stbl"], ts, te)
        except ValueError:
            continue
        cand = {t: (s, e) for t, s, e in boxes(b, stbl_s, stbl_e)}
        if b"stsd" not in cand:
            continue
        s, e = cand[b"stsd"]
        codec = b[s + 12 : s + 16]
        seen_codecs.append(codec)
        if codec == b"jpeg":
            tables = cand
            break
    if tables is None:
        raise ValueError(f"unsupported video codec(s) {seen_codecs!r} (only MJPEG decodes)")
    for need in (b"stsz", b"stco"):
        if need not in tables:
            raise ValueError(f"mp4 sample table missing {need!r}")
    s, e = tables[b"stsz"]
    uniform = int.from_bytes(b[s + 4 : s + 8], "big")
    n = int.from_bytes(b[s + 8 : s + 12], "big")
    # bound declared counts by the PAYLOAD before materializing anything:
    # a poison 0xFFFFFFFF sample count would otherwise allocate a
    # multi-GB list (MemoryError escapes the ValueError quarantine)
    if n == 0 or n > len(b) or (uniform and uniform * n > len(b)):
        raise ValueError("stsz sample count/size exceeds payload")
    if uniform:
        sizes = [uniform] * n
    else:
        if e - (s + 12) < 4 * n:
            raise ValueError("truncated stsz table")
        sizes = [int.from_bytes(b[s + 12 + 4 * i : s + 16 + 4 * i], "big") for i in range(n)]
        if sum(sizes) > len(b):
            raise ValueError("stsz sizes exceed payload")
    s, e = tables[b"stco"]
    n_chunks = int.from_bytes(b[s + 4 : s + 8], "big")
    if n_chunks == 0 or n_chunks > len(b) or e - (s + 8) < 4 * n_chunks:
        raise ValueError("truncated stco table")
    chunk_offsets = [int.from_bytes(b[s + 8 + 4 * i : s + 12 + 4 * i], "big") for i in range(n_chunks)]
    # samples-per-chunk from the REAL stsc run-length table: entries of
    # (first_chunk, samples_per_chunk, _) cover [first_chunk, next_first)
    if b"stsc" in tables:
        s, e = tables[b"stsc"]
        n_ent = int.from_bytes(b[s + 4 : s + 8], "big")
        if n_ent == 0 or n_ent > len(b) or e - (s + 8) < 12 * n_ent:
            raise ValueError("truncated stsc table")
        ent = [
            (
                int.from_bytes(b[s + 8 + 12 * i : s + 12 + 12 * i], "big"),
                int.from_bytes(b[s + 12 + 12 * i : s + 16 + 12 * i], "big"),
            )
            for i in range(n_ent)
        ]
        if ent[0][0] != 1 or any(a[0] >= bb[0] for a, bb in zip(ent, ent[1:])):
            raise ValueError("malformed stsc first-chunk sequence")
        per_chunk_list = []
        for idx, (first, spc) in enumerate(ent):
            last = ent[idx + 1][0] - 1 if idx + 1 < len(ent) else n_chunks
            per_chunk_list += [spc] * (last - first + 1)
        if len(per_chunk_list) != n_chunks or sum(per_chunk_list) < n:
            raise ValueError("stsc does not cover the chunk/sample counts")
    else:  # no stsc: fall back to an even split
        if n % n_chunks:
            raise ValueError("missing stsc with non-uniform chunking")
        per_chunk_list = [n // n_chunks] * n_chunks
    frames = []
    si = 0
    for co, per_chunk in zip(chunk_offsets, per_chunk_list):
        off = co
        for _ in range(per_chunk):
            if si >= n:
                break
            size = sizes[si]
            if off + size > len(b):
                raise ValueError("sample extends past end of file")
            frames.append(decode_jpeg(b[off : off + size]))
            off += size
            si += 1
            if max_frames is not None and len(frames) >= max_frames:
                return frames
    return frames


# ---------------------------------------------------------------------------
# MPEG-1 audio Layer I/II/III SAMPLE decode (operators/mpeg1_audio.py).
# Quarantined like every decoder here.
# ---------------------------------------------------------------------------


@_quarantine
def encode_mpeg1_audio(
    samples, sample_rate: int, layer: int = 2, bitrate_kbps=None,
    use_short_blocks: bool = False, ms_stereo: bool = False,
    intensity_bound: int | None = None, mixed_blocks: bool = False,
) -> bytes:
    """Int16 PCM — mono ``(n,)`` or stereo ``(n, 2)`` — to MPEG-1 Layer
    I/II/III frames (see mpeg1_audio.py for the spec-faithful bitstream
    layout and the documented filterbank / table deviations).  The Layer
    III flags drive the window-switching schedule (``mixed_blocks``
    upgrades its short granules to mixed blocks) and MS joint stereo;
    ``intensity_bound`` enables Layer I/II intensity joint stereo."""
    from esgopeta_spark.operators import mpeg1_audio

    return mpeg1_audio.encode_mpeg1_audio(
        samples, sample_rate, layer, bitrate_kbps,
        use_short_blocks=use_short_blocks, ms_stereo=ms_stereo,
        intensity_bound=intensity_bound, mixed_blocks=mixed_blocks,
    )


@_quarantine
def decode_mpeg1_audio(b: bytes):
    """MPEG-1 Layer I/II/III frames (ID3v2-tagged ok) -> (int16 PCM —
    mono ``(n,)`` or stereo ``(n, 2)`` — and sample_rate).  Layer III
    decodes through the bit reservoir + hybrid IMDCT with MS and
    intensity joint stereo; Layer I/II joint stereo decodes as intensity
    (mode_extension bound).  Every MPEG-1 audio mode now decodes."""
    from esgopeta_spark.operators import mpeg1_audio

    return mpeg1_audio.decode_mpeg1_audio(b)


# ---------------------------------------------------------------------------
# EXIF (JPEG APP1) — orientation + camera text tags.  Phone cameras store
# rotated pixels plus an Orientation tag; a dedup pipeline that ignores it
# treats the same photo as 4 different images.
# ---------------------------------------------------------------------------

_EXIF_TAGS = {0x0112: "orientation", 0x010F: "make", 0x0110: "model",
              0x0132: "datetime"}


@_quarantine
def parse_exif(b: bytes) -> dict:
    """JPEG bytes -> {orientation, make, model, datetime} from the APP1
    Exif segment's IFD0 (None where absent; orientation validated to
    1..8).  Walks JPEG segments like the decoder, then the TIFF
    structure inside APP1 (II/MM byte orders, SHORT + ASCII tag types).
    Raises ValueError only for structurally malformed payloads; a JPEG
    simply WITHOUT Exif returns all-None."""
    out = {v: None for v in _EXIF_TAGS.values()}
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    seg = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad segment marker")
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data, no more tables
            break
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        if marker == 0xE1 and b[pos + 4 : pos + 10] == b"Exif\x00\x00":
            seg = b[pos + 10 : pos + 2 + ln]
            break
        pos += 2 + ln
    if seg is None:
        return out
    if len(seg) < 8:
        raise ValueError("truncated Exif TIFF header")
    bo = {b"II": "<", b"MM": ">"}.get(seg[:2])
    if bo is None or struct.unpack_from(bo + "H", seg, 2)[0] != 42:
        raise ValueError("bad Exif TIFF header")
    (ifd_off,) = struct.unpack_from(bo + "I", seg, 4)
    if ifd_off + 2 > len(seg):
        raise ValueError("bad IFD0 offset")
    (n,) = struct.unpack_from(bo + "H", seg, ifd_off)
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(seg):
            raise ValueError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", seg, e)
        name = _EXIF_TAGS.get(tag)
        if name is None:
            continue
        if typ == 3 and cnt == 1:  # SHORT
            v = struct.unpack_from(bo + "H", seg, e + 8)[0]
            if name == "orientation":
                if not 1 <= v <= 8:
                    raise ValueError(f"invalid Exif orientation {v}")
                out[name] = v
        elif typ == 2:  # ASCII, NUL-terminated; inline when <= 4 bytes
            off = e + 8 if cnt <= 4 else struct.unpack_from(bo + "I", seg, e + 8)[0]
            if off + cnt > len(seg):
                raise ValueError("ASCII tag out of bounds")
            raw = seg[off : off + cnt].split(b"\x00", 1)[0]
            try:
                out[name] = raw.decode("ascii")
            except UnicodeDecodeError as exc:
                raise ValueError("non-ascii Exif text tag") from exc
    return out


def add_exif_orientation(jpeg: bytes, orientation: int, make: str | None = None) -> bytes:
    """Splice a minimal APP1 Exif segment (Orientation + optional Make)
    right after SOI — the fixture twin for :func:`parse_exif`."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")
    entries = [struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)]
    tail = b""
    if make is not None:
        mb = make.encode("ascii") + b"\x00"
        # value offset is from the TIFF header start; header(8) + count(2)
        # + entries + next-IFD(4)
        val_off = 8 + 2 + 12 * 2 + 4
        if len(mb) <= 4:
            entries.append(struct.pack("<HHI4s", 0x010F, 2, len(mb), mb.ljust(4, b"\x00")))
        else:
            entries.append(struct.pack("<HHII", 0x010F, 2, len(mb), val_off))
            tail = mb
    tiff = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", len(entries)) + b"".join(entries)
            + struct.pack("<I", 0) + tail)
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return jpeg[:2] + seg + jpeg[2:]


def apply_exif_orientation(arr: np.ndarray, orientation: int | None) -> np.ndarray:
    """Transform STORED pixels into the upright image per the Exif
    orientation tag (1 = already upright).  The transform pairs are the
    spec's: 2 mirror, 3 rotate 180, 4 vertical mirror, 5 transpose,
    6 rotate 90 CW, 7 transverse, 8 rotate 90 CCW."""
    if orientation in (None, 1):
        return arr
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:
        return np.swapaxes(arr, 0, 1)
    if orientation == 6:
        return np.rot90(arr, k=-1)
    if orientation == 7:
        return np.rot90(arr[:, ::-1], k=-1)
    if orientation == 8:
        return np.rot90(arr, k=1)
    raise ValueError(f"invalid Exif orientation {orientation}")


@_quarantine
def decode_mpeg1_video_frames(b: bytes, max_frames: int = 8) -> list:
    """MPEG-1 video elementary stream -> list of (h, w) uint8 luma
    frames (INTRA pictures only — P/B pictures are parsed past, the
    documented scope of operators/mpeg1_video.py).  Quarantined like
    every decode entry point: malformed payloads raise ValueError."""
    from esgopeta_spark.operators.mpeg1_video import decode_mpeg1_video

    return decode_mpeg1_video(b, max_frames=max_frames)["frames"]


@_quarantine
def encode_mpeg1_video_stream(
    frames, rate_code: int = 3, qscale: int = 4, stuffing: bool = False
) -> bytes:
    """Encoder-twin fixture builder: grayscale frames -> intra-only
    MPEG-1 video elementary stream (operators/mpeg1_video.py)."""
    from esgopeta_spark.operators.mpeg1_video import encode_mpeg1_video

    return encode_mpeg1_video(
        frames, rate_code=rate_code, qscale=qscale, stuffing=stuffing)
