"""From-scratch zstd decoder (RFC 8878, r13): CONFORMANCE against the
in-container libzstd (pyarrow bundles it) — unlike the MP3 B.7
situation, the reference implementation is available, so every decode
structure is pinned against real reference output rather than only
against our own encoder twin.  Plus frame-level forms libzstd's
one-shot API doesn't emit (concatenation, skippable frames, the
checksum flag) and the byte-flip/truncation quarantine contract."""

from __future__ import annotations

import random
import struct

import pytest

pa = pytest.importorskip("pyarrow")

from esgopeta_spark.operators.zstd import (  # noqa: E402
    _fse_build_table,
    _fse_read_ncount,
    zstd_decompress,
)


def _ref(data: bytes, level: int = 3) -> bytes:
    return pa.Codec("zstd", compression_level=level).compress(
        data, asbytes=True)


def test_conformance_matrix_against_libzstd():
    """Every payload class x compression level decodes byte-identical
    to the input libzstd compressed: levels 1/3/9/19 cover predefined
    vs stream-described FSE tables, single vs 4-stream Huffman
    literals, treeless/repeat blocks, multi-block frames, and
    cross-block window references."""
    rng = random.Random(7)
    words = ["the", "quick", "brown", "fox", "data", "pipeline",
             "spark", "zstd", "compression", "frame"]
    cases = {
        "words": " ".join(rng.choice(words) for _ in range(40000)).encode(),
        "random": bytes(rng.randrange(256) for _ in range(300000)),
        "lowent": bytes(rng.choice(b"ab") for _ in range(200000)),
        "runs": b"".join(bytes([rng.randrange(4)]) * rng.randrange(1, 300)
                         for _ in range(3000)),
        "utf8": ("héllo wörld ünïcode ¡text! " * 8000).encode(),
        "zeros": b"\x00" * 100000,
        "tiny": b"x",
        "empty": b"",
    }
    for tag, data in cases.items():
        for lvl in (1, 3, 9, 19):
            assert zstd_decompress(_ref(data, lvl)) == data, (tag, lvl)
        for n in (0, 1, 5, 100, 1000):
            assert zstd_decompress(_ref(data[:n])) == data[:n], (tag, n)


def test_conformance_on_corpus_text():
    """Real corpus prose (the Content-Encoding unwrap's actual input
    class) at the level extremes."""
    import duckdb

    docs = duckdb.sql(
        "select string_agg(text, ' ') from "
        "'/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0].encode()
    for lvl in (1, 19):
        assert zstd_decompress(_ref(docs, lvl)) == docs


def test_frame_forms():
    """Multi-frame concatenation, skippable frames, and the content
    checksum flag (crafted — libzstd's one-shot API doesn't emit it;
    the checksum bytes are consumed, content-size check still binds)."""
    c1 = _ref(b"first frame ")
    c2 = _ref(b"second")
    assert zstd_decompress(c1 + c2) == b"first frame second"
    sk = struct.pack("<II", 0x184D2A50, 4) + b"meta"
    assert zstd_decompress(sk + c1 + sk + c2) == b"first frame second"
    fr = bytearray(c1)
    fr[4] |= 0x04  # set Content_Checksum_flag
    fr += b"\x01\x02\x03\x04"
    assert zstd_decompress(bytes(fr)) == b"first frame "
    # a checksum flag WITHOUT the 4 bytes must quarantine, not pass
    fr2 = bytearray(c1)
    fr2[4] |= 0x04
    with pytest.raises(ValueError):
        zstd_decompress(bytes(fr2))
    # RFC 8878 §3.1.2 (r13 ADVICE): a well-formed payload of ONLY
    # skippable frames decodes to b"" like libzstd — not a quarantine.
    assert zstd_decompress(sk) == b""
    assert zstd_decompress(sk + sk) == b""
    # but a fully-empty payload still quarantines
    with pytest.raises(ValueError):
        zstd_decompress(b"")


def test_quarantine_contract_fuzz():
    """Seeded byte flips / truncations over a real level-19 frame:
    bytes or ValueError, never another exception type."""
    import duckdb

    rng = random.Random(0x25D)
    docs = duckdb.sql(
        "select string_agg(text, ' ') from "
        "'/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0].encode()[:50000]
    base = _ref(docs, 19)
    for trial in range(600):
        fb = bytearray(base)
        if trial % 3 == 0:
            fb = fb[: rng.randrange(1, len(fb))]
        else:
            for _ in range(rng.randrange(1, 6)):
                fb[rng.randrange(len(fb))] = rng.randrange(256)
        try:
            out = zstd_decompress(bytes(fb))
            assert isinstance(out, bytes)
        except ValueError:
            pass


def test_guards():
    """Forged structures fail loudly: bad magic, reserved header bit,
    reserved block type, content-size mismatch, output-cap forgery."""
    with pytest.raises(ValueError):
        zstd_decompress(b"")
    with pytest.raises(ValueError):
        zstd_decompress(b"\x00\x01\x02\x03rest")
    c = bytearray(_ref(b"hello world"))
    c[4] |= 0x08  # reserved frame-header bit
    with pytest.raises(ValueError):
        zstd_decompress(bytes(c))
    # declared content size != decoded size
    c = bytearray(_ref(b"hello world"))
    assert c[4] >> 6 == 0 and (c[4] >> 5) & 1 == 1  # 1-byte FCS form
    c[5] ^= 0x01  # off-by-one the declared size
    with pytest.raises(ValueError):
        zstd_decompress(bytes(c))
    # skippable frame overrunning the payload
    with pytest.raises(ValueError):
        zstd_decompress(struct.pack("<II", 0x184D2A50, 100) + b"short")


def test_fse_ncount_round_trip_shapes():
    """The FSE normalized-count parser on hand-built descriptions:
    accuracy log bounds and sum checks."""
    # accuracy log above the caller's cap
    with pytest.raises(ValueError):
        _fse_read_ncount(b"\x0f\xff\xff", 10, 6)
    # a valid table built from the predefined OF distribution survives
    # build (spread lands on zero, all cells assigned)
    from esgopeta_spark.operators.zstd import PREDEF_OF

    tbl = _fse_build_table(PREDEF_OF[1], PREDEF_OF[0])
    assert len(tbl) == 1 << PREDEF_OF[1]
    assert all(e is not None for e in tbl)


# --- r14: the HOUSE ENCODER, conformance-gated by libzstd DECODE ------------
# (the strictly stronger direction: the reference implementation is the
# authority on every frame the from-scratch compressor emits)

from esgopeta_spark.operators.zstd import (  # noqa: E402
    _fse_normalize,
    _fse_read_ncount as _read_nc,
    _fse_write_ncount,
    zstd_compress,
)


def _ref_decode(blob: bytes, size: int) -> bytes:
    return pa.Codec("zstd").decompress(
        blob, decompressed_size=size, asbytes=True)


def test_encoder_conformance_matrix_against_libzstd():
    """Every payload class x level: libzstd must decode the house
    encoder's output byte-identical, and the house decoder must agree.
    Levels 1/3/9/19 vary the match-search depth; the classes span
    raw/RLE blocks, 1- and 4-stream Huffman literals, RLE/predefined/
    stream-described FSE sequence tables, multi-block frames and
    cross-block window references (bigmixed > 128 KiB)."""
    rng = random.Random(7)
    words = ["the", "quick", "brown", "fox", "data", "pipeline",
             "spark", "zstd", "compression", "frame"]
    cases = {
        "words": " ".join(rng.choice(words) for _ in range(40000)).encode(),
        "random": bytes(rng.randrange(256) for _ in range(300000)),
        "lowent": bytes(rng.choice(b"ab") for _ in range(200000)),
        "runs": b"".join(bytes([rng.randrange(4)]) * rng.randrange(1, 300)
                         for _ in range(3000)),
        "utf8": ("héllo wörld ünïcode ¡text! " * 8000).encode(),
        "zeros": b"\x00" * 100000,
        "tiny": b"x",
        "empty": b"",
        "bigmixed": (b"abcabcabc" * 50000
                     + bytes(rng.randrange(256) for _ in range(200000))),
    }
    for tag, data in cases.items():
        for lvl in (1, 3, 9, 19):
            enc = zstd_compress(data, lvl)
            assert _ref_decode(enc, len(data)) == data, (tag, lvl)
            if data:
                assert zstd_decompress(enc) == data, (tag, lvl)
        for n in (0, 1, 5, 100, 1000):
            p = data[:n]
            enc = zstd_compress(p)
            assert _ref_decode(enc, len(p)) == p, (tag, n)


def test_encoder_conformance_fuzz():
    """Structured fuzz across four payload generators x three levels —
    every frame must survive the reference decoder byte-identical."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    for seed in range(40):
        r = random.Random(seed)
        kind = seed % 4
        if kind == 0:
            p = bytes(r.randrange(r.choice([2, 8, 64, 256]))
                      for _ in range(r.randrange(0, 30000)))
        elif kind == 1:
            base = bytes(r.randrange(256) for _ in range(r.randrange(1, 500)))
            p = base * r.randrange(1, 300)
        elif kind == 2:
            p = b"".join(bytes([r.randrange(256)]) * r.randrange(1, 1000)
                         for _ in range(r.randrange(1, 150)))
        else:
            p = " ".join(r.choice(words)
                         for _ in range(r.randrange(0, 15000))).encode()
        for lvl in (1, 3, 19):
            enc = zstd_compress(p, lvl)
            assert _ref_decode(enc, len(p)) == p, (seed, lvl)
            if p:
                assert zstd_decompress(enc) == p, (seed, lvl)


def test_encoder_conformance_on_corpus_text():
    """Real corpus prose through the house encoder at the level
    extremes — the .warc.zst write path's actual input class."""
    import duckdb

    docs = duckdb.sql(
        "select string_agg(text, ' ') from "
        "'/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0].encode()
    for lvl in (1, 19):
        enc = zstd_compress(docs, lvl)
        assert _ref_decode(enc, len(docs)) == docs
        assert zstd_decompress(enc) == docs


def test_encoder_ncount_write_read_round_trip():
    """_fse_write_ncount is the exact inverse of _fse_read_ncount for
    normalized histograms across alphabet shapes and accuracy logs
    (incl. zero-runs >= 3, the 2-bit repeat-flag path)."""
    shapes = [
        {0: 1000, 1: 500, 2: 250, 3: 125},
        {0: 1, 35: 1},                      # sparse ends, long zero run
        {i: 1 for i in range(36)},          # flat wide
        {0: 7, 5: 3, 6: 2, 30: 90},         # skewed with gaps
        {2: 1},                             # near-degenerate (2 symbols min
        # handled by caller; normalize pads present-only)
    ]
    for hist in shapes:
        if len(hist) < 2:
            hist[1] = hist.get(1, 0) + 1
        for al in (5, 6, 8, 9):
            if len(hist) > (1 << al):
                continue
            counts = _fse_normalize(hist, al, 52)
            desc = _fse_write_ncount(al, counts)
            al2, counts2, consumed = _read_nc(desc, 52, 9)
            assert al2 == al
            got = list(counts2) + [0] * (len(counts) - len(counts2))
            want = list(counts) + [0] * (len(counts2) - len(counts))
            assert got[: len(want)] == want
            assert consumed <= len(desc)


def test_encoder_compression_is_real():
    """The encoder must actually compress compressible classes (not
    degenerate to raw blocks): corpus prose under 40% at level 3 and
    within 1.6x of libzstd's size at the same level."""
    import duckdb

    docs = duckdb.sql(
        "select string_agg(text, ' ') from "
        "'/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0].encode()
    house = len(zstd_compress(docs, 3))
    ref = len(_ref(docs, 3))
    assert house < 0.4 * len(docs)
    assert house < 1.6 * ref


def test_house_frame_per_record_warc_zst_through_production_ingest():
    """The .warc.zst WRITE loop: house frame-per-record output (plus a
    leading skippable dictionary-slot frame) must decode through the
    PRODUCTION ingest chain (maybe_gunzip_warc -> parse_warc, pyarrow
    streaming zstd preferred) record-exactly; a truncated final frame
    must fail the chain (quarantine direction), never partial-parse."""
    from esgopeta_spark.operators.web import (
        build_warc_record,
        maybe_gunzip_warc,
        parse_warc,
    )

    recs = [build_warc_record(f"https://ex.com/{i}",
                              f"payload {i}".encode() * (i + 1))
            for i in range(4)]
    blob = b"".join(zstd_compress(r, level=(1, 3, 9, 19)[i % 4])
                    for i, r in enumerate(recs))
    sk = struct.pack("<II", 0x184D2A50, 4) + b"dict"
    for b in (blob, sk + blob):
        parsed = parse_warc(maybe_gunzip_warc(b))
        assert [p["uri"] for p in parsed] == [
            f"https://ex.com/{i}" for i in range(4)]
        assert parsed[2]["payload"] == b"payload 2" * 3
    with pytest.raises(ValueError):  # quarantine contract: never OSError
        parse_warc(maybe_gunzip_warc(blob[:-6]))
