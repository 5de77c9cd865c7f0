"""Pure-numpy baseline JPEG codec (G5) — no external codec library.

Scope (what a training-data pipeline needs to ingest real images):

- **decode_jpeg**: baseline sequential DCT JPEGs (SOF0) — 8-bit,
  grayscale or YCbCr, any sampling factors up to 2x2 (so 4:4:4, 4:2:2
  and the ubiquitous 4:2:0 all work), restart markers, multiple
  DQT/DHT segments, APPn/COM skipping.  Progressive (SOF2) and
  arithmetic-coded variants raise ValueError (callers quarantine).
- **encode_jpeg**: baseline 4:4:4 (or single-component grayscale)
  with per-image canonical Huffman tables (written to DHT, as the spec
  allows) and Annex-K quantization tables scaled by ``quality``.

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


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """uint8 image -> baseline JFIF bytes.  (h, w) / (h, w, 1) grayscale
    or (h, w, 3) RGB — 4:4:4 by default, 4:2:0 (2x2-box chroma
    downsample) with ``subsample=True``; ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (resettable scans, and it
    exercises the decoder's restart path).  Huffman tables are built per
    image (canonical, <=16 bits) and written to DHT."""
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
    restart_interval = 0
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated JPEG (no SOS)")
        if b[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before scan")
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. sequential)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            pos += seglen
            return _decode_scan(b, pos, frame, scan_comps, qtabs, huff, restart_interval)
        # APPn, COM, anything else: skip
        pos += seglen


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
    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)
