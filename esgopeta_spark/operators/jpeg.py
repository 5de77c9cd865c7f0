"""Pure-numpy baseline JPEG codec (G5) — no external codec library.

Scope (what a training-data pipeline needs to ingest real images):

- **decode_jpeg**: baseline sequential DCT JPEGs (SOF0) — 8-bit,
  grayscale or YCbCr, any sampling factors up to 2x2 (so 4:4:4, 4:2:2
  and the ubiquitous 4:2:0 all work), restart markers, multiple
  DQT/DHT segments, APPn/COM skipping — AND progressive JPEGs (SOF2,
  the most common non-baseline format in real web corpora): spectral
  selection + successive approximation, DC/AC first and refinement
  scans, interleaved and single-component scan geometry, EOB runs,
  per-scan DHT redefinition, restart intervals.  Arithmetic-coded and
  hierarchical variants raise ValueError (callers quarantine).
- **encode_jpeg**: baseline 4:4:4 (or single-component grayscale)
  with per-image canonical Huffman tables (written to DHT, as the spec
  allows) and Annex-K quantization tables scaled by ``quality``.
- **encode_jpeg_progressive**: SOF2 with a libjpeg-style scan script
  (successive approximation on both DC and AC, per-scan Huffman
  tables built by a counting pass) — the fixture twin that lets the
  progressive decoder be round-trip-tested with no external codec.

Everything is numpy + stdlib: the 8x8 DCT/IDCT are exact matrix
products (C @ block @ C.T), entropy coding is plain Python over numpy
coefficient arrays.  Per-image cost is milliseconds at thumbnail sizes —
inside Arrow-batched mapInPandas kernels that is the granularity that
matters; a SIMD codec library is the documented production swap.

JPEG is lossy: round-trip tests assert PSNR bounds and exact
dimensions, not bit equality (tests/test_codecs.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

# zigzag scan order: ZIGZAG[i] = row-major index of the i-th scanned coeff
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 quantization tables
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# 8x8 DCT-II basis matrix: dct = C @ block @ C.T, idct = C.T @ coef @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(1 / 8) if _u == 0 else 0.5) * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    ql = np.clip(np.floor((_QL * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return ql, qc


# ---------------------------------------------------------------------------
# huffman — canonical codes from (BITS, HUFFVAL); per-image build for encode
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS[1..16], HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies -> (BITS, HUFFVAL) with code length <= 16 and the
    all-ones code reserved (libjpeg's trick: a sentinel symbol 256 with
    count 1 takes the longest code and is dropped from the table)."""
    freq = np.zeros(257, dtype=np.int64)
    for s, f in freqs.items():
        freq[s] = f
    freq[256] = 1  # sentinel reserves the all-1s code
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)

    while True:
        nz = np.flatnonzero(freq)
        if len(nz) <= 1:
            break
        # two least-frequent symbols (ties -> larger symbol value first,
        # matching libjpeg so tables are deterministic)
        order = nz[np.lexsort((-nz, freq[nz]))]
        c1, c2 = int(order[0]), int(order[1])
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] != -1:
            c1 = int(others[c1])
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] != -1:
            c2 = int(others[c2])
            codesize[c2] += 1

    bits = np.zeros(33, dtype=np.int64)
    for s in range(257):
        if codesize[s]:
            bits[min(int(codesize[s]), 32)] += 1
    # limit code lengths to 16 (T.81 K.3 adjustment)
    for length in range(32, 16, -1):
        while bits[length] > 0:
            j = length - 2
            while bits[j] == 0:
                j -= 1
            bits[length] -= 2
            bits[length - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # drop the sentinel's code (the longest one)
    for length in range(16, 0, -1):
        if bits[length]:
            bits[length] -= 1
            break
    # HUFFVAL: symbols sorted by (code length, symbol value), sentinel out
    pairs = sorted((int(codesize[s]), s) for s in range(256) if codesize[s])
    huffval = [s for _, s in pairs]
    return list(bits[1:17]), huffval


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.nbits = 0

    def marker(self, m: int) -> None:
        self.pad_to_byte()
        self.buf += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RST markers are
    consumed by the MCU loop via ``sync_restart``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy data")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("truncated entropy data")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("unexpected RST inside coefficient")
            else:
                raise ValueError(f"marker 0x{nxt:02x} inside entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume padding + an RSTn marker at a restart interval."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and not (d[self.pos] == 0xFF and d[self.pos + 1] != 0x00):
            self.pos += 1
        if self.pos + 1 >= len(d) or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("missing restart marker")
        self.pos += 2


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _component_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Plane (padded to 8s) -> (n_blocks, 64) int quantized zigzag coeffs,
    blocks in raster order."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    shifted = blocks - 128.0
    coefs = np.einsum("ux,nxy,vy->nuv", _C, shifted, _C)
    q = np.round(coefs.reshape(-1, 64) / qtab.reshape(1, 64))
    return q[:, ZIGZAG].astype(np.int64)


def _rle_symbols(zz: np.ndarray, prev_dc: int) -> tuple[list[tuple[int, int, int]], int]:
    """One block's zigzag coeffs -> [(symbol, extra_value, extra_size)],
    DC first; returns the new DC predictor."""
    out = []
    dc = int(zz[0])
    diff = dc - prev_dc
    size = _category(diff)
    out.append((size, diff if diff >= 0 else diff + (1 << size) - 1, size))
    run = 0
    last_nz = int(np.max(np.flatnonzero(zz))) if np.any(zz) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append((0xF0, 0, 0))  # ZRL
            run -= 16
        size = _category(v)
        out.append(((run << 4) | size, v if v >= 0 else v + (1 << size) - 1, size))
        run = 0
    if last_nz < 63:
        out.append((0x00, 0, 0))  # EOB
    return out, dc


def _prepare_blocks(arr: np.ndarray, quality: int, subsample: bool):
    """uint8 image -> per-component quantized zigzag blocks + geometry
    (shared by the baseline and progressive encoders)."""
    assert arr.dtype == np.uint8
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    ql, qc = _quant_tables(quality)
    if ncomp == 1:
        samp = [(1, 1)]
        planes = [arr[..., 0].astype(np.float64)]
    else:
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1), (1, 1), (1, 1)]
        ycc = _to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per component: (down)sample, pad to its MCU-aligned grid, block+quantize
    comp_zz = []
    for ci, p in enumerate(planes):
        ch, cv = samp[ci]
        if ch < hmax or cv < vmax:  # 2x2 box mean, on an even-padded plane
            pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
            p = (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0
        tw, th = mcux * 8 * ch, mcuy * 8 * cv
        padded = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        comp_zz.append(_component_blocks(padded, ql if ci == 0 else qc))
    return h, w, ncomp, samp, comp_zz, ql, qc, mcux, mcuy


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """uint8 image -> baseline JFIF bytes.  (h, w) / (h, w, 1) grayscale
    or (h, w, 3) RGB — 4:4:4 by default, 4:2:0 (2x2-box chroma
    downsample) with ``subsample=True``; ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (resettable scans, and it
    exercises the decoder's restart path).  Huffman tables are built per
    image (canonical, <=16 bits) and written to DHT."""
    h, w, ncomp, samp, comp_zz, ql, qc, mcux, mcuy = _prepare_blocks(arr, quality, subsample)
    # walk blocks in interleaved MCU order, building the symbol stream with
    # per-component DC prediction; collect class frequencies as we go
    n_classes = 1 if ncomp == 1 else 2
    dc_freq = [dict() for _ in range(n_classes)]
    ac_freq = [dict() for _ in range(n_classes)]
    mcu_stream: list[list[tuple[int, list[tuple[int, int, int]]]]] = []
    pred = [0] * ncomp
    bx = [mcux * s[0] for s in samp]  # blocks per row, per component
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and len(mcu_stream) % restart_interval == 0 and mcu_stream:
                pred = [0] * ncomp  # DC prediction resets at each restart
            mcu: list[tuple[int, list[tuple[int, int, int]]]] = []
            for ci in range(ncomp):
                ch, cv = samp[ci]
                cls = 0 if ci == 0 else 1
                for v in range(cv):
                    for hh in range(ch):
                        bi = (my * cv + v) * bx[ci] + (mx * ch + hh)
                        syms, pred[ci] = _rle_symbols(comp_zz[ci][bi], pred[ci])
                        mcu.append((cls, syms))
                        dc_freq[cls][syms[0][0]] = dc_freq[cls].get(syms[0][0], 0) + 1
                        for s, _, _ in syms[1:]:
                            ac_freq[cls][s] = ac_freq[cls].get(s, 0) + 1
            mcu_stream.append(mcu)

    dc_tabs = [_build_huffman(f) for f in dc_freq]
    ac_tabs = [_build_huffman(f) for f in ac_freq]
    dc_codes = [_canonical_codes(*t) for t in dc_tabs]
    ac_codes = [_canonical_codes(*t) for t in ac_tabs]

    bw = _BitWriter()
    for i, mcu in enumerate(mcu_stream):
        if restart_interval and i and i % restart_interval == 0:
            bw.marker(0xD0 + ((i // restart_interval - 1) % 8))
        for cls, syms in mcu:
            s0, extra, esz = syms[0]
            code, ln = dc_codes[cls][s0]
            bw.write(code, ln)
            if esz:
                bw.write(extra, esz)
            for s, extra, esz in syms[1:]:
                code, ln = ac_codes[cls][s]
                bw.write(code, ln)
                if esz:
                    bw.write(extra, esz)
    scan = bw.flush()

    # ---- segments ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in ((0, ql), (1, qc))[: (1 if ncomp == 1 else 2)]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in tab[ZIGZAG]
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls in range(n_classes):
        for tc, (bits, huffval) in ((0, dc_tabs[cls]), (1, ac_tabs[cls])):
            body = bytes([(tc << 4) | cls]) + bytes(bits) + bytes(huffval)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder
# ---------------------------------------------------------------------------


class _CountSink:
    """Symbol-frequency collector for the table-building pass."""

    def __init__(self) -> None:
        self.freq: dict[int, int] = {}

    def sym(self, s: int) -> None:
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, value: int, size: int) -> None:
        pass


class _WriteSink:
    """Real emitter: huffman-codes symbols into the shared bit writer."""

    def __init__(self, bw: _BitWriter, codes: dict[int, tuple[int, int]]) -> None:
        self.bw = bw
        self.codes = codes

    def sym(self, s: int) -> None:
        code, ln = self.codes[s]
        self.bw.write(code, ln)

    def bits(self, value: int, size: int) -> None:
        if size:
            self.bw.write(value, size)


def _comp_band_grid(comp_zz, samp, ci, mcux, mcuy, w, h, hmax, vmax):
    """Raster block indices a non-interleaved scan covers for component ci
    (the un-padded block grid; padding blocks belong to interleave only)."""
    ch, cv = samp[ci]
    bw = (-(-(w * ch) // hmax) + 7) // 8
    bh = (-(-(h * cv) // vmax) + 7) // 8
    row_blocks = mcux * ch
    return [by * row_blocks + bx for by in range(bh) for bx in range(bw)]


def _emit_dc_scan(sink_for, comp_zz, samp, scan_cis, ah, al, mcux, mcuy, w, h, hmax, vmax):
    """DC scan body (first pass when ah == 0, refinement otherwise),
    interleaved when len(scan_cis) > 1."""
    pred = {ci: 0 for ci in scan_cis}

    def one(ci: int, bi: int) -> None:
        sink = sink_for(ci)
        dc = int(comp_zz[ci][bi][0])
        if ah == 0:
            t = dc >> al  # arithmetic shift (T.81 G.1.2.1)
            diff = t - pred[ci]
            pred[ci] = t
            size = _category(diff)
            sink.sym(size)
            sink.bits(diff if diff >= 0 else diff + (1 << size) - 1, size)
        else:
            sink.bits((dc >> al) & 1, 1)

    if len(scan_cis) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in scan_cis:
                    ch, cv = samp[ci]
                    row_blocks = mcux * ch
                    for v in range(cv):
                        for hh in range(ch):
                            one(ci, (my * cv + v) * row_blocks + (mx * ch + hh))
    else:
        ci = scan_cis[0]
        for bi in _comp_band_grid(comp_zz, samp, ci, mcux, mcuy, w, h, hmax, vmax):
            one(ci, bi)


def _emit_ac_first(sink, zz_blocks, block_ids, ss, se, al):
    """AC first pass for one component: EOB runs + magnitude-shifted
    values (T.81 G.1.2.2)."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0

    for bi in block_ids:
        zz = zz_blocks[bi]
        vals = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            vals.append(-((-v) >> al) if v < 0 else v >> al)
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                sink.sym(0xF0)
                r -= 16
            size = _category(v)
            sink.sym((r << 4) | size)
            sink.bits(v if v >= 0 else v + (1 << size) - 1, size)
            r = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(sink, zz_blocks, block_ids, ss, se, al):
    """AC refinement pass (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine):
    newly-significant coefficients as (run, 1) symbols + sign bit, with
    correction bits for already-significant ones buffered behind the
    next emitted symbol, and EOB runs carrying their buffered bits."""
    eobrun = 0
    pend: list[int] = []  # correction bits owed after the next EOBn symbol

    def flush() -> None:
        nonlocal eobrun, pend
        if eobrun:
            r = eobrun.bit_length() - 1
            sink.sym(r << 4)
            sink.bits(eobrun - (1 << r), r)
            eobrun = 0
        for bit in pend:
            sink.bits(bit, 1)
        pend = []

    for bi in block_ids:
        zz = zz_blocks[bi]
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = -1  # index (band-relative) of the last newly-significant coeff
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        br: list[int] = []  # correction bits behind the current zero run
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                flush()
                sink.sym(0xF0)
                r -= 16
                for bit in br:
                    sink.bits(bit, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush()
            sink.sym((r << 4) | 1)
            sink.bits(1 if int(zz[ss + i]) > 0 else 0, 1)
            r = 0
            for bit in br:
                sink.bits(bit, 1)
            br = []
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF or len(pend) > 930:
                flush()
    flush()


# libjpeg's default-script shape: DC with one approximation bit, luma AC
# split into bands with two approximation bits, chroma AC with one.
# (component indices, Ss, Se, Ah, Al)
_PROGRESSIVE_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROGRESSIVE_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, subsample: bool = False, scans=None
) -> bytes:
    """uint8 image -> progressive (SOF2) JFIF bytes with a libjpeg-style
    scan script: spectral selection + successive approximation on both DC
    and AC.  Each scan gets its own canonical Huffman table (built by a
    counting pass, written to DHT just before the SOS — table slot 0 is
    redefined between scans, which the spec allows and real decoders
    rely on).  ``scans`` overrides the script as a list of
    (component_indices, Ss, Se, Ah, Al)."""
    h, w, ncomp, samp, comp_zz, ql, qc, mcux, mcuy = _prepare_blocks(arr, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if scans is None:
        scans = _PROGRESSIVE_SCRIPT_GRAY if ncomp == 1 else _PROGRESSIVE_SCRIPT_COLOR

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in ((0, ql), (1, qc))[: (1 if ncomp == 1 else 2)]:
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in tab[ZIGZAG]
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    for scan_cis, ss, se, ah, al in scans:
        scan_cis = [ci for ci in scan_cis]
        is_dc = ss == 0
        needs_huff = not (is_dc and ah > 0)  # DC refinement is raw bits
        tabs: dict[int, tuple[list[int], list[int]]] = {}
        if needs_huff:
            # counting pass: one table slot per component class (0 = luma,
            # 1 = chroma) for interleaved DC; AC scans have one component
            counters: dict[int, _CountSink] = {}

            def count_sink(ci: int) -> _CountSink:
                cls = 0 if ci == 0 else 1
                if cls not in counters:
                    counters[cls] = _CountSink()
                return counters[cls]

            if is_dc:
                _emit_dc_scan(
                    count_sink, comp_zz, samp, scan_cis, ah, al, mcux, mcuy, w, h, hmax, vmax
                )
            else:
                ci = scan_cis[0]
                ids = _comp_band_grid(comp_zz, samp, ci, mcux, mcuy, w, h, hmax, vmax)
                cs = count_sink(ci)
                if ah == 0:
                    _emit_ac_first(cs, comp_zz[ci], ids, ss, se, al)
                else:
                    _emit_ac_refine(cs, comp_zz[ci], ids, ss, se, al)
            for cls, counter in counters.items():
                tabs[cls] = _build_huffman(counter.freq) if counter.freq else ([0] * 16, [])
            tc = 0 if is_dc else 1
            for cls, (bits, huffval) in sorted(tabs.items()):
                body = bytes([(tc << 4) | cls]) + bytes(bits) + bytes(huffval)
                out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

        sos = bytes([len(scan_cis)])
        for ci in scan_cis:
            cls = 0 if ci == 0 else 1
            sos += bytes([ci + 1, ((cls << 4) | cls) if needs_huff else 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        bw = _BitWriter()
        writers = {
            cls: _WriteSink(bw, _canonical_codes(*t)) for cls, t in tabs.items()
        }
        raw = _WriteSink(bw, {})  # DC refinement: bits only, no symbols

        def write_sink(ci: int) -> _WriteSink:
            return writers.get(0 if ci == 0 else 1, raw)

        if is_dc:
            _emit_dc_scan(
                write_sink, comp_zz, samp, scan_cis, ah, al, mcux, mcuy, w, h, hmax, vmax
            )
        else:
            ci = scan_cis[0]
            ids = _comp_band_grid(comp_zz, samp, ci, mcux, mcuy, w, h, hmax, vmax)
            ws = write_sink(ci)
            if ah == 0:
                _emit_ac_first(ws, comp_zz[ci], ids, ss, se, al)
            else:
                _emit_ac_refine(ws, comp_zz[ci], ids, ss, se, al)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) RGB (or (h, w, 1) grayscale)
    uint8.  Supports SOF0, sampling factors up to 2x2 (4:4:4 / 4:2:2 /
    4:2:0), restart intervals.  Anything else — including any malformed
    byte stream — raises ValueError (the quarantine contract)."""
    try:
        return _decode_jpeg(b)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_jpeg(b: bytes) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    coef: dict[int, np.ndarray] = {}  # comp id -> (n_blocks, 64) zigzag ints
    scans_done = 0
    restart_interval = 0
    while True:
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG (no SOS)")
        if b[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:
            # at least one decoded scan required: SOF2+EOI with zero scans
            # would otherwise fabricate an all-gray image from the empty
            # coefficient store instead of quarantining
            if progressive and coef and scans_done:
                return _reconstruct_progressive(frame, coef, qtabs)
            raise ValueError("EOI before scan")
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                qtabs[tq] = tab[UNZIGZAG]  # store row-major
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                codes = _canonical_codes(bits, huffval)
                huff[(tc, th)] = {(ln, code): sym for sym, (code, ln) in codes.items()}
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline/ext., SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (fh, fw, comps)
            if marker == 0xC2:
                progressive = True
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if hmax > 2 or vmax > 2 or any(c["h"] < 1 or c["v"] < 1 for c in comps):
                    raise ValueError("sampling factors beyond 2x2 unsupported")
                if fh == 0 or fw == 0:
                    raise ValueError("zero-sized frame")
                mcux = (fw + 8 * hmax - 1) // (8 * hmax)
                mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    coef[c["id"]] = np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS header")
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _decode_progressive_scan(
                    b, pos + seglen, frame, scan_comps, ss, se, ahal >> 4, ahal & 0xF,
                    huff, restart_interval, coef,
                )
                scans_done += 1
                continue
            pos += seglen
            return _decode_scan(b, pos, frame, scan_comps, qtabs, huff, restart_interval)
        # APPn, COM, anything else: skip
        pos += seglen


def _scan_geometry(frame):
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _refine_nonzero(cf, k, se, p1, m1, reader):
    """Correction bits for already-nonzero coefficients in cf[k..se]
    (T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine tail)."""
    while k <= se:
        v = int(cf[k])
        if v != 0 and reader.bit():
            if (v & p1) == 0:
                cf[k] = v + (p1 if v >= 0 else m1)
        k += 1


def _decode_progressive_scan(b, pos, frame, scan_comps, ss, se, ah, al, huff, restart_interval, coef):
    """One SOF2 scan into the per-component zigzag coefficient store;
    returns the byte position of the next marker."""
    fh, fw, comps = frame
    hmax, vmax, mcux, mcuy = _scan_geometry(frame)
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        if sc["cs"] not in by_id:
            raise ValueError("scan references unknown component")
    if ss > se or se > 63 or al > 13 or ah > 13:
        raise ValueError("bad spectral selection / approximation")
    reader = _BitReader(b, pos)
    p1, m1 = 1 << al, -(1 << al)

    if ss == 0:  # ---- DC scan (interleaved or single-component) ----
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        pred = {sc["cs"]: 0 for sc in scan_comps}

        def dc_block(cf, sc):
            if ah == 0:  # first pass
                tab = huff.get((0, sc["td"]))
                if tab is None:
                    raise ValueError("missing huffman table")
                size = _decode_huff(reader, tab)
                if size > 11:
                    raise ValueError("DC category out of range")
                diff = _extend(reader.bits(size), size) if size else 0
                pred[sc["cs"]] += diff
                cf[0] = pred[sc["cs"]] << al
            else:  # refinement: one bit, OR-ed in two's complement
                if reader.bit():
                    cf[0] = int(cf[0]) | p1

        if len(scan_comps) > 1:
            count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and count % restart_interval == 0:
                        reader.sync_restart()
                        pred = {sc["cs"]: 0 for sc in scan_comps}
                    for sc in scan_comps:
                        c = by_id[sc["cs"]]
                        row_blocks = mcux * c["h"]
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                bi = (my * c["v"] + v) * row_blocks + (mx * c["h"] + hh)
                                dc_block(coef[c["id"]][bi], sc)
                    count += 1
        else:
            sc = scan_comps[0]
            c = by_id[sc["cs"]]
            bw = (-(-(fw * c["h"]) // hmax) + 7) // 8
            bh = (-(-(fh * c["v"]) // vmax) + 7) // 8
            row_blocks = mcux * c["h"]
            count = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and count and count % restart_interval == 0:
                        reader.sync_restart()
                        pred = {sc["cs"]: 0}
                    dc_block(coef[c["id"]][by * row_blocks + bx], sc)
                    count += 1
    else:  # ---- AC scan: single component, non-interleaved ----
        if len(scan_comps) != 1:
            raise ValueError("interleaved AC scan is illegal in progressive JPEG")
        sc = scan_comps[0]
        c = by_id[sc["cs"]]
        tab = huff.get((1, sc["ta"]))
        if tab is None:
            raise ValueError("missing huffman table")
        bw = (-(-(fw * c["h"]) // hmax) + 7) // 8
        bh = (-(-(fh * c["v"]) // vmax) + 7) // 8
        row_blocks = mcux * c["h"]
        eobrun = 0
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count and count % restart_interval == 0:
                    reader.sync_restart()
                    eobrun = 0
                count += 1
                cf = coef[c["id"]][by * row_blocks + bx]
                if ah == 0:  # ---- first pass: EOB runs + shifted values ----
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_huff(reader, tab)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.bits(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("AC coefficient overrun")
                        cf[k] = _extend(reader.bits(s), s) << al
                        k += 1
                else:  # ---- refinement pass ----
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _decode_huff(reader, tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.bits(r)
                                    break
                                newval = 0  # ZRL: skip 16 zero-history coeffs
                            else:
                                if s != 1:
                                    raise ValueError("refinement magnitude > 1")
                                newval = p1 if reader.bit() else m1
                            while k <= se:
                                v = int(cf[k])
                                if v != 0:
                                    if reader.bit() and (v & p1) == 0:
                                        cf[k] = v + (p1 if v >= 0 else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval:
                                if k > se:
                                    raise ValueError("AC refinement overrun")
                                cf[k] = newval
                            k += 1
                    if eobrun > 0:
                        _refine_nonzero(cf, k, se, p1, m1, reader)
                        eobrun -= 1
    # skip any padding bits, then locate the next marker
    p = reader.pos
    n = len(b)
    while p + 1 < n and not (
        b[p] == 0xFF and b[p + 1] != 0x00 and not (0xD0 <= b[p + 1] <= 0xD7)
    ):
        p += 1
    if p + 1 >= n:
        raise ValueError("truncated progressive JPEG (no trailing marker)")
    return p


def _reconstruct_progressive(frame, coef, qtabs):
    fh, fw, comps = frame
    hmax, vmax, mcux, mcuy = _scan_geometry(frame)
    planes = {}
    for c in comps:
        q = qtabs.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        zz = coef[c["id"]].astype(np.float64)  # (n_blocks, 64) zigzag
        blocks = (zz[:, UNZIGZAG] * q.reshape(1, 64)).reshape(-1, 8, 8)
        pix = np.einsum("xu,nuv,vy->nxy", _C.T, blocks, _C) + 128.0
        brow, bcol = mcuy * c["v"], mcux * c["h"]
        planes[c["id"]] = (
            pix.reshape(brow, bcol, 8, 8).transpose(0, 2, 1, 3).reshape(brow * 8, bcol * 8)
        )
    return _planes_to_image(planes, frame)


def _planes_to_image(planes, frame):
    """Upsample each component to full resolution, crop, color-convert."""
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)


def _decode_scan(b, pos, frame, scan_comps, qtabs, huff, restart_interval):
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] < 1 or c["v"] < 1 for c in comps):
        raise ValueError("sampling factors beyond 2x2 unsupported")
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    planes = {}
    for c in comps:
        cw = mcux * 8 * c["h"]
        ch = mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ch, cw), dtype=np.float64)
    reader = _BitReader(b, pos)
    pred = {c["id"]: 0 for c in comps}
    zz = np.zeros(64, dtype=np.float64)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            for sc in scan_comps:
                c = by_id[sc["cs"]]
                dc_tab = huff.get((0, sc["td"]))
                ac_tab = huff.get((1, sc["ta"]))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing huffman table")
                q = qtabs.get(c["tq"])
                if q is None:
                    raise ValueError("missing quant table")
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz[:] = 0.0
                        size = _decode_huff(reader, dc_tab)
                        diff = _extend(reader.bits(size), size) if size else 0
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tab)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient overrun")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        block = (zz[UNZIGZAG] * q.reshape(-1)).reshape(8, 8)
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    return _planes_to_image(planes, frame)
