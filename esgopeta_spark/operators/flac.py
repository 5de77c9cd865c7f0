"""From-scratch FLAC lossless audio codec (public spec: RFC 9639 /
xiph.org "FLAC format"), pure python+numpy — no external audio libs.

Decoder coverage targets REAL corpus files: metadata-block walk with
STREAMINFO, every block-size/sample-rate/sample-size header code, UTF-8
coded frame numbers, all four subframe types (CONSTANT / VERBATIM /
FIXED orders 0-4 / LPC orders 1-32), both residual coding methods
(4-bit Rice and 5-bit Rice2) with partition orders and raw-escape
partitions, wasted-bits shifts, all four channel assignments
(independent, left/side, right/side, mid/side), CRC-8 header and CRC-16
frame checks, and the STREAMINFO MD5 of the unencoded audio.  Unlike
the Layer III Huffman dialect (mpeg1_audio.py), NOTHING here depends on
transcribed spec tables — the format is fully structural — so a FLAC
file produced by any real encoder decodes, and corruption is caught by
the checksums.

The encoder twin is for fixtures and round-trips: per-block stereo-mode
search (the standard sum-of-abs estimator), constant/verbatim/fixed
(0-4)/LPC (Levinson-Durbin, quantized coefficients) subframe search,
per-partition Rice parameter search with raw escape, wasted-bits
detection.  Lossless: decode(encode(x)) is bit-identical to x for every
mode — pinned in tests/test_codecs.py.

Quarantine contract: the public entry points raise ONLY ValueError on
malformed input (codecs.decode_media wraps them in _quarantine as well).

Scale shape: whole-file kernels invoked per row from Arrow mapInPandas
batches (operators/multimodal.py) — shuffle-free, like every codec here.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# CRCs (FLAC frame integrity): CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, MSB-first
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = []
    for byte in range(256):
        r = byte << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tab.append(r)
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TAB[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TAB[((r >> 8) ^ b) & 0xFF]
    return r


# ---------------------------------------------------------------------------
# bit IO (MSB first) with the unary reads Rice coding needs
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, b: bytes, pos_bits: int = 0):
        self.b = b
        self.pos = pos_bits

    def get(self, bits: int) -> int:
        end = self.pos + bits
        if end > len(self.b) * 8:
            raise ValueError("truncated FLAC bitstream")
        out = 0
        pos = self.pos
        # byte-at-a-time fast path
        while bits > 0:
            byte = self.b[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < bits else bits
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            bits -= take
        self.pos = pos
        return out

    def get_signed(self, bits: int) -> int:
        v = self.get(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        n = 0
        pos = self.pos
        nbits = len(self.b) * 8
        while True:
            if pos >= nbits:
                raise ValueError("truncated unary code")
            if (self.b[pos >> 3] >> (7 - (pos & 7))) & 1:
                self.pos = pos + 1
                return n
            n += 1
            pos += 1

    def align(self):
        self.pos = (self.pos + 7) & ~7


class _BitsW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, bits: int):
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def put_signed(self, val: int, bits: int):
        self.put(val & ((1 << bits) - 1), bits)

    def put_unary(self, q: int):
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        if self.n:
            raise ValueError("unaligned bit buffer")
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample index; extended to 36 bits)
# ---------------------------------------------------------------------------


def _utf8_encode_num(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if v < (1 << bits):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (v >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((v >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode_num(r: _Bits) -> int:
    b0 = r.get(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad UTF-8 frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = r.get(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ---------------------------------------------------------------------------
# header code tables (structural, from the public spec text)
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLERATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                     6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                     11: 96000}
_SAMPLESIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_residual(r: _Bits, block_size: int, order: int) -> list[int]:
    method = r.get(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.get(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise ValueError("block size not divisible by partition count")
    res: list[int] = []
    for p in range(nparts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("partition smaller than predictor order")
        param = r.get(plen)
        if param == escape:
            raw_bits = r.get(5)
            if raw_bits == 0:
                res.extend([0] * n)
            else:
                res.extend(r.get_signed(raw_bits) for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                rem = r.get(param) if param else 0
                z = (q << param) | rem
                res.append((z >> 1) ^ -(z & 1))  # un-zigzag
    return res


def _decode_subframe(r: _Bits, block_size: int, bps: int) -> list[int]:
    if r.get(1):
        raise ValueError("subframe padding bit set")
    sft = r.get(6)
    wasted = 0
    if r.get(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if sft == 0:  # CONSTANT
        v = r.get_signed(eff)
        out = [v] * block_size
    elif sft == 1:  # VERBATIM
        out = [r.get_signed(eff) for _ in range(block_size)]
    elif 8 <= sft <= 12:  # FIXED order 0-4
        order = sft - 8
        if order > block_size:
            raise ValueError("fixed order exceeds block size")
        out = [r.get_signed(eff) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(res):
            n = order + i
            pred = sum(c * out[n - 1 - j] for j, c in enumerate(coefs))
            out.append(e + pred)
    elif sft >= 32:  # LPC order 1-32
        order = sft - 31
        if order > block_size:
            raise ValueError("LPC order exceeds block size")
        out = [r.get_signed(eff) for _ in range(order)]
        prec = r.get(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = r.get_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.get_signed(prec) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        for i, e in enumerate(res):
            n = order + i
            pred = sum(c * out[n - 1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(e + pred)
    else:
        raise ValueError(f"reserved subframe type {sft}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes):
    """FLAC bytes -> (samples int32 array [n, channels], sample_rate,
    bits_per_sample).  Raises ValueError on any malformed structure,
    CRC mismatch, or (when checkable) STREAMINFO-MD5 mismatch."""
    # real-corpus tolerance: strip a leading ID3v2 envelope (synchsafe
    # size + optional footer) and a trailing 128-byte ID3v1 block —
    # nonstandard around FLAC but common in scraped audio
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
               ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        data = data[10 + size + (10 if data[5] & 0x10 else 0):]
    if len(data) >= 128 and data[-128:-125] == b"TAG":
        data = data[:-128]
    if len(data) < 42 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4
        if pos + blen > len(data):
            raise ValueError("truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            si = data[pos : pos + 34]
            sr = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            channels = ((si[12] >> 1) & 0x7) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
            info = {"sr": sr, "channels": channels, "bps": bps,
                    "total": total, "md5": si[18:34]}
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += blen
        if last:
            break
    if info is None or info["sr"] == 0:
        raise ValueError("missing or invalid STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(info["channels"])]
    while pos < len(data):
        frame_start = pos
        r = _Bits(data, pos * 8)
        sync = r.get(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        if r.get(1):
            raise ValueError("reserved frame header bit set")
        r.get(1)  # blocking strategy (frame vs sample number)
        bs_code = r.get(4)
        sr_code = r.get(4)
        ch_code = r.get(4)
        ss_code = r.get(3)
        if r.get(1):
            raise ValueError("reserved frame header bit set")
        _utf8_decode_num(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            block_size = r.get(8) + 1
        elif bs_code == 7:
            block_size = r.get(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            sr = info["sr"]
        elif sr_code == 12:
            sr = r.get(8) * 1000
        elif sr_code == 13:
            sr = r.get(16)
        elif sr_code == 14:
            sr = r.get(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        else:
            sr = _SAMPLERATE_CODES[sr_code]
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code == 3:
            raise ValueError("reserved sample size code")
        else:
            bps = _SAMPLESIZE_CODES[ss_code]
        if ch_code < 8:
            nch = ch_code + 1
            side = None
        elif ch_code <= 10:
            nch = 2
            side = ("ls", "rs", "ms")[ch_code - 8]
        else:
            raise ValueError("reserved channel assignment")
        if nch != info["channels"]:
            raise ValueError("frame channel count differs from STREAMINFO")
        header_len = (r.pos // 8) - frame_start
        hcrc = r.get(8)
        if crc8(data[frame_start : frame_start + header_len]) != hcrc:
            raise ValueError("frame header CRC-8 mismatch")

        subs = []
        for ch in range(nch):
            eff_bps = bps
            if side == "ls" and ch == 1:
                eff_bps += 1
            elif side == "rs" and ch == 0:
                eff_bps += 1
            elif side == "ms" and ch == 1:
                eff_bps += 1
            subs.append(_decode_subframe(r, block_size, eff_bps))
        r.align()
        fend = r.pos // 8
        fcrc = r.get(16)
        if crc16(data[frame_start:fend]) != fcrc:
            raise ValueError("frame CRC-16 mismatch")
        pos = r.pos // 8

        if side == "ls":
            left, s = subs
            subs = [left, [l - sv for l, sv in zip(left, s)]]
        elif side == "rs":
            s, right = subs
            subs = [[rv + sv for rv, sv in zip(right, s)], right]
        elif side == "ms":
            mid, s = subs
            lr = []
            rr = []
            for m, sv in zip(mid, s):
                m2 = (m << 1) | (sv & 1)
                lr.append((m2 + sv) >> 1)
                rr.append((m2 - sv) >> 1)
            subs = [lr, rr]
        for ch in range(nch):
            chans[ch].extend(subs[ch])

    n = len(chans[0])
    if info["total"] and n > info["total"]:
        for ch in range(len(chans)):
            chans[ch] = chans[ch][: info["total"]]
        n = info["total"]
    out = np.array(chans, dtype=np.int64).T.astype(np.int32)
    if info["md5"] != b"\x00" * 16 and info["bps"] % 8 == 0:
        if _audio_md5(out, info["bps"]) != info["md5"]:
            raise ValueError("STREAMINFO MD5 mismatch (decoded audio differs)")
    return out, info["sr"], info["bps"]


def _audio_md5(samples: np.ndarray, bps: int) -> bytes:
    """MD5 of the unencoded audio: channel-interleaved samples,
    little-endian, bps/8 bytes each (the libFLAC layout)."""
    flat = samples.reshape(-1)
    if bps == 8:
        raw = flat.astype("<i1").tobytes()
    elif bps == 16:
        raw = flat.astype("<i2").tobytes()
    elif bps == 24:  # low 3 bytes of the LE int32 two's complement
        raw = np.frombuffer(flat.astype("<i4").tobytes(), dtype=np.uint8)
        raw = raw.reshape(-1, 4)[:, :3].tobytes()
    else:  # bps == 32
        raw = flat.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------


def _zigzag(e: int) -> int:
    return (abs(e) << 1) - (1 if e < 0 else 0)


def _signed_width(e: int) -> int:
    """Smallest nb with -2^(nb-1) <= e < 2^(nb-1)."""
    return (e.bit_length() if e >= 0 else (-e - 1).bit_length()) + 1


def _best_rice_param(res: list[int], plen: int):
    """(param, cost_bits) — param == escape when raw coding wins; raw
    width is the partition's max needed signed width (residuals of an
    order-k predictor can exceed the sample width by up to k bits, so
    the raw escape must size itself from the data, not from eff bps)."""
    escape = (1 << plen) - 1
    if not res:
        return 0, plen
    zs = [_zigzag(e) for e in res]
    best_p, best_c = None, None
    total = sum(zs)
    # param search seeded at log2(mean), widened both ways
    import math as _m

    mean = max(total // max(len(zs), 1), 1)
    seed = min(max(int(_m.log2(mean)), 0), escape - 1)
    for p in range(max(0, seed - 2), min(escape, seed + 3)):
        c = sum((z >> p) + 1 + p for z in zs)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    raw_bits = min(max(_signed_width(e) for e in res), 31)
    raw_c = 5 + raw_bits * len(res)
    if raw_c < best_c:
        return escape, raw_c
    return best_p, best_c


def _encode_residual(w: _BitsW, res: list[int], block_size: int, order: int,
                     part_order: int, rice2: bool = False):
    plen = 5 if rice2 else 4
    escape = (1 << plen) - 1
    w.put(1 if rice2 else 0, 2)  # coding method: 4-bit Rice / 5-bit Rice2
    w.put(part_order, 4)
    nparts = 1 << part_order
    idx = 0
    for p in range(nparts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        part = res[idx : idx + n]
        idx += n
        param, _ = _best_rice_param(part, plen)
        w.put(param, plen)
        if param == escape:
            raw_bits = min(max(_signed_width(e) for e in part), 31) if part else 0
            w.put(raw_bits, 5)
            for e in part:
                w.put_signed(e, raw_bits)
        else:
            for e in part:
                z = _zigzag(e)
                w.put_unary(z >> param)
                if param:
                    w.put(z & ((1 << param) - 1), param)


def _fixed_residual(x: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    return [
        x[n] - sum(c * x[n - 1 - j] for j, c in enumerate(coefs))
        for n in range(order, len(x))
    ]


def _lpc_analyze(x: list[int], order: int, precision: int = 12):
    """Levinson-Durbin + coefficient quantization; returns
    (qcoefs, shift) or None when analysis degenerates."""
    n = len(x)
    if n <= order:
        return None
    xf = np.asarray(x, dtype=np.float64)
    ac = [float(np.dot(xf[: n - k], xf[k:])) for k in range(order + 1)]
    if ac[0] == 0.0:
        return None
    err = ac[0]
    lpc = np.zeros(order)
    for i in range(order):  # Levinson-Durbin recursion
        acc = ac[i + 1]
        for j in range(i):
            acc -= lpc[j] * ac[i - j]
        k = acc / err
        new = lpc.copy()
        new[i] = k
        for j in range(i):
            new[j] = lpc[j] - k * lpc[i - 1 - j]
        lpc = new
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    cmax = float(np.max(np.abs(lpc)))
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))  # 5-bit SIGNED field: [0, 15] usable
    lim = 1 << (precision - 1)
    q = [int(np.clip(round(c * (1 << shift)), -lim, lim - 1)) for c in lpc]
    if all(v == 0 for v in q):
        return None
    return q, shift


def _lpc_residual(x: list[int], q: list[int], shift: int) -> list[int]:
    order = len(q)
    return [
        x[n] - (sum(c * x[n - 1 - j] for j, c in enumerate(q)) >> shift)
        for n in range(order, len(x))
    ]


def _encode_subframe(w: _BitsW, x: list[int], bps: int, part_order: int,
                     use_lpc: bool, lpc_order: int, rice2: bool = False):
    # wasted-bits detection: common low zero bits across the block
    wasted = 0
    if any(x):
        agg = 0
        for v in x:
            agg |= v
        while not (agg >> wasted) & 1:
            wasted += 1
        if wasted:
            x = [v >> wasted for v in x]
    eff = bps - wasted

    def emit_wasted():
        if wasted:
            w.put(1, 1)
            w.put_unary(wasted - 1)
        else:
            w.put(0, 1)

    if all(v == x[0] for v in x):
        w.put(0, 1)
        w.put(0, 6)  # CONSTANT
        emit_wasted()
        w.put_signed(x[0], eff)
        return
    bs = len(x)
    po = part_order if bs % (1 << part_order) == 0 and (bs >> part_order) > 4 else 0
    # candidate search: fixed orders 0-4 (+ optional LPC), cost = Σ|residual|
    cands = []
    for order in range(5):
        if order > bs:
            break
        res = _fixed_residual(x, order)
        cands.append(("fixed", order, None, res, sum(_zigzag(e) for e in res)))
    if use_lpc:
        la = _lpc_analyze(x, min(lpc_order, bs - 1))
        if la is not None:
            q, shift = la
            res = _lpc_residual(x, q, shift)
            cands.append(("lpc", len(q), (q, shift), res, sum(_zigzag(e) for e in res)))
    kind, order, extra, res, _cost = min(cands, key=lambda t: t[4])
    est_bits = order * eff + _best_rice_param(res, 5 if rice2 else 4)[1]
    if est_bits >= bs * eff:  # VERBATIM wins
        w.put(0, 1)
        w.put(1, 6)
        emit_wasted()
        for v in x:
            w.put_signed(v, eff)
        return
    if kind == "fixed":
        w.put(0, 1)
        w.put(8 + order, 6)
        emit_wasted()
        for v in x[:order]:
            w.put_signed(v, eff)
        _encode_residual(w, res, bs, order, po if bs >> po > order else 0, rice2)
    else:
        q, shift = extra
        w.put(0, 1)
        w.put(32 + order - 1, 6)
        emit_wasted()
        for v in x[:order]:
            w.put_signed(v, eff)
        w.put(12 - 1, 4)  # precision 12
        w.put_signed(shift, 5)
        for c in q:
            w.put_signed(c, 12)
        _encode_residual(w, res, bs, order, po if bs >> po > order else 0, rice2)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    use_lpc: bool = True,
    lpc_order: int = 8,
    partition_order: int = 2,
    rice2: bool = False,
) -> bytes:
    """(n, channels) int array -> FLAC bytes.  ``stereo_mode`` forces a
    channel assignment for 2-channel input: 'auto' (per-block sum-of-abs
    search), 'independent', 'ls', 'rs', 'ms'."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    if n == 0 or nch == 0 or nch > 8:
        raise ValueError("empty or over-wide audio")
    if bps not in (8, 12, 16, 20, 24):
        raise ValueError("encoder supports 8/12/16/20/24 bits per sample")
    lim = 1 << (bps - 1)
    s64 = samples.astype(np.int64)
    if s64.max() >= lim or s64.min() < -lim:
        raise ValueError("samples exceed bits-per-sample range")
    if not 16 <= block_size <= 65535:
        raise ValueError("block size out of range")

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block_size)):
        blk = s64[start : start + block_size]
        bs = blk.shape[0]
        chans = [blk[:, c].tolist() for c in range(nch)]
        side_code = None
        if nch == 2:
            left, right = chans
            sd = [l - r for l, r in zip(left, right)]
            md = [(l + r) >> 1 for l, r in zip(left, right)]
            costs = {
                "independent": sum(map(abs, left)) + sum(map(abs, right)),
                "ls": sum(map(abs, left)) + sum(map(abs, sd)),
                "rs": sum(map(abs, right)) + sum(map(abs, sd)),
                "ms": sum(map(abs, md)) + sum(map(abs, sd)),
            }
            mode = stereo_mode if stereo_mode != "auto" else min(costs, key=costs.get)
            if mode == "ls":
                chans, side_code, extra = [left, sd], 8, (0, 1)
            elif mode == "rs":
                chans, side_code, extra = [sd, right], 9, (1, 0)
            elif mode == "ms":
                chans, side_code, extra = [md, sd], 10, (0, 1)
            else:
                extra = (0, 0)
        hw = _BitsW()
        hw.put(0x3FFE, 14)
        hw.put(0, 1)
        hw.put(0, 1)  # fixed blocking strategy: frame number
        if bs in (192, 576, 1152, 2304, 4608, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bcode = {v: k for k, v in _BLOCKSIZE_CODES.items()}[bs]
            btail = None
        else:
            bcode, btail = 7, bs - 1
        hw.put(bcode, 4)
        rcodes = {v: k for k, v in _SAMPLERATE_CODES.items()}
        if sample_rate in rcodes:
            rcode, rtail = rcodes[sample_rate], None
        elif sample_rate < 65536:
            rcode, rtail = 13, sample_rate
        elif sample_rate % 10 == 0 and sample_rate // 10 < 65536:
            rcode, rtail = 14, sample_rate // 10
        else:
            raise ValueError("sample rate not representable")
        hw.put(rcode, 4)
        hw.put(side_code if side_code is not None else nch - 1, 4)
        hw.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        hw.put(0, 1)
        for byte in _utf8_encode_num(fi):
            hw.put(byte, 8)
        if btail is not None:
            hw.put(btail, 16)
        if rtail is not None:
            hw.put(rtail, 16)
        hw.align()
        header = hw.bytes()
        header += bytes([crc8(header)])

        bw = _BitsW()
        for ci, x in enumerate(chans):
            eff = bps + ((side_code is not None) and extra[ci])
            _encode_subframe(bw, x, eff, partition_order, use_lpc, lpc_order, rice2)
        bw.align()
        body = header + bw.bytes()
        frames += body + struct.pack(">H", crc16(body))

    si = bytearray(34)
    si[0:2] = struct.pack(">H", block_size)
    si[2:4] = struct.pack(">H", block_size)
    # min/max frame size unknown (0 = not stated)
    si[10] = (sample_rate >> 12) & 0xFF
    si[11] = (sample_rate >> 4) & 0xFF
    si[12] = ((sample_rate & 0xF) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4)
    si[13] = (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF)
    si[14:18] = struct.pack(">I", n & 0xFFFFFFFF)
    if bps % 8 == 0:
        si[18:34] = _audio_md5(s64[:, :].astype(np.int32), bps)
    # non-byte-multiple bps: md5 stays zero = "not stated" (decoder skips)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si  # last-block STREAMINFO
    out += frames
    return bytes(out)
