"""Bounded PDF text extraction (r11): object model, xref walk +
incremental updates + fallback scan, stream filters, page tree,
content-stream text operators, the encoder-twin round trip, the
quarantine/fuzz contract, crawl-chain routing, and the stateless
streaming pin."""

from __future__ import annotations

import random
import zlib

import pytest

from esgopeta_spark.operators.pdf import (
    _parse_object,
    build_pdf,
    extract_pdf_text,
    pdf_extract,
    synth_pdf,
)


# ---------------------------------------------------------------------------
# object model
# ---------------------------------------------------------------------------


def test_parse_object_matrix():
    obj, _ = _parse_object(b" << /A 1 /B [2 3.5 (s) /N] /C << /D true >> >>", 0)
    assert obj == {"A": 1, "B": [2, 3.5, b"s", "N"], "C": {"D": True}}
    # names with #xx escapes
    obj, _ = _parse_object(b"/Name#20with#2Fslash", 0)
    assert obj == "Name with/slash"
    # indirect references vs plain ints
    obj, _ = _parse_object(b"[1 0 R 2 3 4 1 R]", 0)
    assert [repr(o) for o in obj] == ["1 0 R", "2", "3", "4 1 R"]
    # literal string escapes: all eight, octal (1-3 digits), nesting,
    # line continuation, CR normalization
    obj, _ = _parse_object(rb"(a\(b\)c \\ \n\t\r\b\f \101\41\7 (nested) )", 0)
    assert obj == b"a(b)c \\ \n\t\r\x08\x0c A!\x07 (nested) "
    obj, _ = _parse_object(b"(line\\\ncont)", 0)
    assert obj == b"linecont"
    obj, _ = _parse_object(b"(cr\rhere\r\ntoo)", 0)
    assert obj == b"cr\nhere\ntoo"
    # hex strings: whitespace tolerated, odd length pads 0
    obj, _ = _parse_object(b"<41 4243>", 0)
    assert obj == b"ABC"
    obj, _ = _parse_object(b"<414>", 0)
    assert obj == b"A@"
    # booleans / null / floats
    assert _parse_object(b" true", 0)[0] is True
    assert _parse_object(b"null", 0)[0] is None
    assert _parse_object(b"-1.5", 0)[0] == -1.5
    # comments are whitespace
    assert _parse_object(b"% note\n 42", 0)[0] == 42


def test_parse_object_malformed_raises_valueerror():
    for bad in [b"", b"(unterminated", b"<zz>", b"<< /K >>", b"[1 2",
                b"<< 1 2 >>", b"}"]:
        with pytest.raises(ValueError):
            _parse_object(bad, 0)


# ---------------------------------------------------------------------------
# encoder-twin round trip
# ---------------------------------------------------------------------------


def test_build_extract_round_trip_matrix():
    cases = [
        (0, "hello world"),            # even: FlateDecode path
        (1, "odd uncompressed"),
        (2, ""),                        # empty text: line drops
        (3, "with (parens) and \\ backslash"),
        (4, "tab\there and\nnewline"),  # escapes survive verbatim
        (7, "café naïve — dash"),       # cp1252 round trip (WinAnsi)
        (123456, "x" * 2000),           # long text
    ]
    for i, t in cases:
        got = extract_pdf_text(build_pdf(i, t))
        want = f"Doc {i}\n" + (t + "\n" if t else "") + f"Length: {len(t)}\nEnd."
        assert got == want, (i, got[:80])


def test_pdf_structure_features():
    """The fixture really exercises the claimed structure: compressed
    page-1 stream for even ids, indirect /Length on page 2, a real
    xref table the parser resolves (no fallback scan needed)."""
    even, odd = build_pdf(2, "abc"), build_pdf(3, "abc")
    assert b"/Filter /FlateDecode" in even and b"/Filter" not in odd
    assert b"/Length 8 0 R" in even  # indirect length
    # corrupting the startxref number only (forcing the fallback scan)
    # must NOT change the answer — both paths resolve the same objects
    i = even.rfind(b"startxref")
    broken = even[:i] + b"startxref\n999999999\n%%EOF\n"
    assert extract_pdf_text(broken) == extract_pdf_text(even)


def test_incremental_update_newest_wins():
    """An appended body (incremental update: new object 4, new xref
    with /Prev to the old one) must shadow the original page content —
    the xref walk is newest-first."""
    def updated(base, old_xref):
        c1 = b"BT /F1 12 Tf 72 720 Td (Doc 1) Tj 0 -14 TD (updated text) Tj ET"
        upd = bytearray(base)
        off4 = len(upd)
        upd += (b"4 0 obj\n<< /Length " + str(len(c1)).encode()
                + b" >>\nstream\n" + c1 + b"\nendstream\nendobj\n")
        new_xref = len(upd)
        upd += (b"xref\n0 1\n0000000000 65535 f \n4 1\n"
                + f"{off4:010d} 00000 n \n".encode()
                + b"trailer\n<< /Size 11 /Root 1 0 R /Prev "
                + str(old_xref).encode() + b" >>\nstartxref\n"
                + str(new_xref).encode() + b"\n%%EOF\n")
        return bytes(upd)

    base = build_pdf(1, "original text", modern=False)
    got = extract_pdf_text(updated(base, base.rfind(b"xref\n")))
    assert got == "Doc 1\nupdated text\nLength: 13\nEnd."
    # the MIXED chain real incremental saves produce: a classic update
    # section whose /Prev points at a 1.5 base's xref STREAM
    mbase = build_pdf(1, "original text", modern=True)
    sx = mbase.rfind(b"startxref")
    stream_xref_off = int(mbase[sx + 9 :].split()[0])
    got2 = extract_pdf_text(updated(mbase, stream_xref_off))
    assert got2 == "Doc 1\nupdated text\nLength: 13\nEnd."


def test_asciihex_filter_and_utf16_strings():
    c1 = b"BT (plain) Tj T* <FEFF04100411> Tj ET"
    hexed = c1.hex().encode("ascii") + b">"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(hexed)).encode()
        + b" /Filter [/ASCIIHexDecode] >>\nstream\n" + hexed
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"  # no xref: fallback scan
    )
    # the hex string shows the UTF-16BE text (BOM-prefixed) as cyrillic
    assert extract_pdf_text(pdf) == "plain\nАБ"


def test_multi_stream_page_and_tj_kerning():
    """A /Contents ARRAY concatenates streams; TJ ignores kerning
    numbers between strings; Tm and ' break lines."""
    s1 = b"BT [(ker) -120 (ned)] TJ"
    s2 = b"1 0 0 1 72 700 Tm (second) Tj (third) ' ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(s1)).encode() + b" >>\nstream\n"
        + s1 + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(s2)).encode() + b" >>\nstream\n"
        + s2 + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "kerned\nsecond\nthird"


def test_page_tree_cycle_guard_and_missing_root():
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [2 0 R 3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ""  # self-kid skipped, page empty
    with pytest.raises(ValueError):
        extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n%%EOF\n")
    with pytest.raises(ValueError):
        extract_pdf_text(b"not a pdf at all")


# ---------------------------------------------------------------------------
# stream filters (r13: LZW both dialects / RunLength / ASCII85 / chains)
# ---------------------------------------------------------------------------


def test_runlength_codec_matrix():
    from esgopeta_spark.operators.pdf import (
        _runlength_decode,
        _runlength_encode,
    )

    rng = random.Random(0xA5)
    for _ in range(50):
        n = rng.randrange(0, 2000)
        # runs + literals mixed: low-entropy alphabet forces both paths
        data = bytes(rng.choice(b"aab") for _ in range(n))
        assert _runlength_decode(_runlength_encode(data)) == data
    # a run longer than 128 must split correctly
    assert _runlength_decode(_runlength_encode(b"x" * 300)) == b"x" * 300
    # EOD stops decoding; trailing junk after EOD is ignored
    assert _runlength_decode(b"\x02abc\x80junk") == b"abc"
    # missing EOD tolerated
    assert _runlength_decode(b"\x02abc") == b"abc"
    # truncations raise the quarantine type
    with pytest.raises(ValueError):
        _runlength_decode(b"\x05ab")  # literal cut short
    with pytest.raises(ValueError):
        _runlength_decode(b"\xfe")  # run byte missing


def test_ascii85_codec_matrix():
    from esgopeta_spark.operators.pdf import _ascii85_decode, _ascii85_encode

    rng = random.Random(0x85)
    for _ in range(30):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 500)))
        assert _ascii85_decode(_ascii85_encode(data)) == data
    # z zero-group shorthand + embedded whitespace + ~> EOD
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _ascii85_decode(b" 9jqo^\nBlbD-BleB1DJ+*+F(f,q~>") == \
        b"Man is distinguished"
    with pytest.raises(ValueError):
        _ascii85_decode(b"\xff\xfe not base85 ~>")


def test_pdf_filter_matrix_extracts():
    """Every id%5 filter class round-trips through the REAL extractor,
    and the /EarlyChange 0 DecodeParms is honored (decoding that
    stream in the default dialect would garble past the first width
    bump)."""
    from esgopeta_spark.operators.pdf import build_pdf_filtered

    # long repetitive text drives the LZW table past several width bumps
    t = " ".join(f"word{i % 7} token" for i in range(400))
    for k in range(5):
        got = extract_pdf_text(build_pdf_filtered(k + 20, t))
        assert got == f"Doc {k + 20}\n{t}\nFilter: {k}", k
        assert extract_pdf_text(build_pdf_filtered(k + 20, "")) == \
            f"Doc {k + 20}\nFilter: {k}"


def test_lzw_early_change_dialects_differ():
    """The two /EarlyChange dialects really are different bitstreams on
    table-heavy input — the DecodeParms path is load-bearing, not
    decorative."""
    from esgopeta_spark.operators.codecs import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    data = bytes((i * 7) % 251 for i in range(4000))
    early = _tiff_lzw_encode(data, early_change=True)
    late = _tiff_lzw_encode(data, early_change=False)
    assert early != late
    assert _tiff_lzw_decode(late, None, early_change=False) == data
    # cross-dialect decode must not silently return the right bytes
    try:
        wrong = _tiff_lzw_decode(late, None, early_change=True)
        assert wrong != data
    except ValueError:
        pass  # visible failure is equally acceptable


def test_pdf_filtered_fuzz_quarantine():
    """Byte flips / truncations over every filter class: str or
    ValueError, never another exception type."""
    from esgopeta_spark.operators.pdf import build_pdf_filtered

    rng = random.Random(0xF117E5)
    bases = [build_pdf_filtered(k, "fuzz corpus body with some length")
             for k in range(5)]
    for trial in range(300):
        b = bytearray(bases[trial % 5])
        if trial % 3 == 0:
            b = b[: rng.randrange(1, len(b))]
        else:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            out = extract_pdf_text(bytes(b))
            assert isinstance(out, str)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# quarantine / fuzz contract
# ---------------------------------------------------------------------------


def test_pdf_quarantine_contract_fuzz():
    """Seeded byte flips / truncations / splices over real fixture
    bytes: extract_pdf_text returns a str or raises ValueError — never
    any other exception type (the codecs quarantine contract)."""
    rng = random.Random(0x9DF11)
    base = build_pdf(6, "fuzz corpus text body with some length to it")
    for trial in range(400):
        b = bytearray(base)
        kind = trial % 4
        if kind == 0:
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif kind == 1:
            b = b[: rng.randrange(1, len(b))]
        elif kind == 2:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(16)) + b[i:]
        else:
            # corrupt the zlib stream specifically
            i = base.find(b"stream\n") + 7
            b[i + rng.randrange(10)] ^= 0xFF
        try:
            out = extract_pdf_text(bytes(b))
            assert isinstance(out, str)
        except ValueError:
            pass


def test_pdf_extract_df_quarantines_per_row(spark):
    rows = [
        (1, build_pdf(1, "good text")),
        (2, b"%PDF-1.4 then garbage with no objects"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, pdf: binary")
    got = {r["doc_id"]: (r["pdf_text"], r["n_lines"], r["n_pages"])
           for r in pdf_extract(df).collect()}
    assert got[1] == ("Doc 1\ngood text\nLength: 9\nEnd.", 4, 2)
    assert got[2] == ("", -1, -1)
    assert got[3] == ("", -1, -1)


# ---------------------------------------------------------------------------
# crawl-chain routing
# ---------------------------------------------------------------------------


def test_warc_route_and_doc_text_cover_pdf(spark):
    from esgopeta_spark.operators.codecs import sniff_format
    from esgopeta_spark.operators.web import (
        build_warc_record,
        warc_doc_text,
        warc_route,
    )

    assert sniff_format(b"%PDF-1.7\n") == "pdf"
    pdf = build_pdf(9, "routed body")
    html = b"<!DOCTYPE html><html><body><p>page text here</p></body></html>"
    rows = [
        (1, build_warc_record("https://a.com/doc.pdf", pdf)),
        (2, build_warc_record("https://a.com/page.html", html)),
        (3, build_warc_record("https://a.com/bin", b"\x00\x01\x02 opaque")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    routed = {r["doc_id"]: (r["kind"], r["stat"]) for r in warc_route(df).collect()}
    want_text = "Doc 9\nrouted body\nLength: 11\nEnd."
    assert routed[1] == ("pdf", len(want_text))
    assert routed[2][0] == "html"
    assert routed[3] == ("unknown", -1)
    texts = {r["doc_id"]: (r["kind"], r["clean_text"])
             for r in warc_doc_text(df).collect()}
    assert texts[1] == ("pdf", want_text)
    assert texts[2] == ("html", "page text here")
    assert 3 not in texts  # non-document records drop


# ---------------------------------------------------------------------------
# streaming pin (stateless: share the batch projection, don't mirror)
# ---------------------------------------------------------------------------


def test_pdf_extract_stream_twin(spark, tmp_path):
    rows = [(i, build_pdf(i, f"stream doc {i} body")) for i in range(8)]
    rows.append((99, b"%PDF- poison"))
    df = spark.createDataFrame(rows, "doc_id: long, pdf: binary")
    want = {tuple(r) for r in pdf_extract(df).collect()}
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "pdfs"))
    stream = spark.readStream.schema("doc_id long, pdf binary").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(tmp_path / "pdfs"))
    q = (
        pdf_extract(stream)
        .writeStream.format("memory")
        .queryName("pdfstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM pdfstream").collect()}
    assert got == want and len(got) == 9


def test_synth_pdf_matches_python_encoder(spark):
    """The Arrow synth kernel is byte-identical to the local encoder
    (one source of truth for the fixture)."""
    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta ( ) \\"), (7, "")], "doc_id: long, text: string"
    )
    got = {r["doc_id"]: bytes(r["pdf"]) for r in synth_pdf(df).collect()}
    for i, t in [(1, "alpha"), (2, "beta ( ) \\"), (7, "")]:
        assert got[i] == build_pdf(i, t)


def test_modern_layout_objstm_xref_stream():
    """PDF 1.5 layout (r11 second wave — where post-2005 PDFs live):
    catalog/pages/page/font/length objects packed in a FlateDecode
    /Type /ObjStm, cross-reference as a /Type /XRef STREAM (W [1 3 1],
    PNG Up predictor rows, type-2 entries), page 2's indirect /Length
    resolving THROUGH the object stream.  Same closed-form text as the
    classic layout — one oracle covers both."""
    for i, t in [(1, "modern"), (4, "modern and compressed page"), (13, "")]:
        pdf = build_pdf(i, t, modern=True)
        assert b"/Type /ObjStm" in pdf and b"/Type /XRef" in pdf
        assert b"trailer" not in pdf  # the xref stream IS the trailer
        want = f"Doc {i}\n" + (t + "\n" if t else "") + f"Length: {len(t)}\nEnd."
        assert extract_pdf_text(pdf) == want
    # default policy: id%3==1 emits the modern layout
    assert b"/Type /XRef" in build_pdf(7, "x")
    assert b"/Type /XRef" not in build_pdf(6, "x")
    # ObjStm members are NOT recoverable by the fallback scan (they live
    # inside compressed bytes): corrupting startxref on a modern file is
    # a clean ValueError, not garbage output
    pdf = build_pdf(1, "modern")
    i = pdf.rfind(b"startxref")
    broken = pdf[:i] + b"startxref\n999999999\n%%EOF\n"
    with pytest.raises(ValueError):
        extract_pdf_text(broken)


def test_predictor_matrix():
    """The /DecodeParms predictor decoder: PNG None/Sub/Up/Average/
    Paeth rows at bpp=1, TIFF horizontal differencing, malformed rows
    quarantine."""
    from esgopeta_spark.operators.pdf import _apply_predictor

    # PNG Up: verified round trip by construction
    rows = [bytes([1, 2, 3, 4]), bytes([5, 6, 7, 8]), bytes([9, 1, 2, 3])]
    enc = bytearray()
    prev = bytes(4)
    for r in rows:
        enc += bytes([2]) + bytes((r[c] - prev[c]) & 0xFF for c in range(4))
        prev = r
    assert _apply_predictor(bytes(enc), 12, 4) == b"".join(rows)
    # PNG Sub
    enc2 = bytearray()
    for r in rows:
        out = [r[0]] + [(r[c] - r[c - 1]) & 0xFF for c in range(1, 4)]
        enc2 += bytes([1]) + bytes(out)
    assert _apply_predictor(bytes(enc2), 12, 4) == b"".join(rows)
    # None rows pass through
    enc3 = b"".join(bytes([0]) + r for r in rows)
    assert _apply_predictor(enc3, 12, 4) == b"".join(rows)
    # TIFF predictor 2
    t = bytes([10, 5, 5, 200, 56, 0])
    dec = _apply_predictor(t, 2, 3)
    assert dec == bytes([10, 15, 20, 200, 0, 0])
    # predictor 1 = passthrough
    assert _apply_predictor(t, 1, 3) == t
    # malformed: bad row type / ragged rows / bad predictor id
    for bad, pred, cols in [(b"\x09aaaa", 12, 4), (b"\x00abc", 12, 4),
                            (b"abc", 7, 3), (b"abc", 12, 0)]:
        with pytest.raises(ValueError):
            _apply_predictor(bad, pred, cols)


def test_modern_fuzz_quarantine():
    """Byte-flip/truncate fuzz over the MODERN fixture: str or
    ValueError, nothing else (the ObjStm/xref-stream paths share the
    quarantine contract)."""
    rng = random.Random(0x0B757)
    base = build_pdf(13, "modern fuzz corpus body with some length")
    for trial in range(250):
        b = bytearray(base)
        if trial % 3 == 0:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif trial % 3 == 1:
            b = b[: rng.randrange(1, len(b))]
        else:
            i = base.find(b"/Type /XRef")
            b[i + rng.randrange(5, 40)] ^= 0xFF
        try:
            out = extract_pdf_text(bytes(b))
            assert isinstance(out, str)
        except ValueError:
            pass


def test_extract_pdf_info_matrix():
    """/Info metadata: both layouts carry it (classic: second xref
    subsection; modern: ObjStm member referenced from the xref-stream
    dict); date prefix normalizes; absent /Info degrades to ''."""
    from esgopeta_spark.operators.pdf import extract_pdf_info

    for modern in (False, True):
        info = extract_pdf_info(build_pdf(14, "alpha beta gamma delta epsilon",
                                          modern=modern))
        assert info == {"title": "Doc 14: alpha beta gamma delta",
                        "author": "corpus", "created": "2024-03-15",
                        "n_pages": 2}, (modern, info)
    assert extract_pdf_info(build_pdf(5, ""))["title"] == "Doc 5"
    # hand-built file without /Info: fields empty, pages counted
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_info(pdf) == {"title": "", "author": "",
                                     "created": "", "n_pages": 1}
    with pytest.raises(ValueError):
        extract_pdf_info(b"junk, not a pdf")


def test_pdf_info_df_quarantines(spark):
    from esgopeta_spark.operators.pdf import pdf_info

    rows = [(1, build_pdf(1, "good words here now")), (2, b"%PDF- junk"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id: long, pdf: binary")
    got = {r["doc_id"]: (r["title"], r["author"], r["created"], r["n_pages"])
           for r in pdf_info(df).collect()}
    assert got[1] == ("Doc 1: good words here now", "corpus", "2024-02-02", 2)
    assert got[2] == ("", "", "", -1)
    assert got[3] == ("", "", "", -1)


# ---------------------------------------------------------------------------
# Link annotations (r11 third wave)
# ---------------------------------------------------------------------------


def test_extract_pdf_links_matrix():
    """Annotation walk corners: URI actions in page/array order across
    BOTH file layouts (annots pack into the ObjStm in 1.5), escaped
    parens in the URI string, no /Annots -> [], non-Link subtypes and
    GoTo (internal) actions skipped, and the no-links build stays
    byte-compatible with extraction (text/info unchanged)."""
    from esgopeta_spark.operators.pdf import (
        build_pdf,
        extract_pdf_links,
        extract_pdf_text,
    )

    links = ("https://a.org/x", "https://b.org/(p)?q=1")
    for modern in (False, True):
        pdf = build_pdf(3, "body", modern, links=links)
        assert extract_pdf_links(pdf) == list(links)
        assert extract_pdf_text(pdf).startswith("Doc 3\nbody\nLength: 4")
    assert extract_pdf_links(build_pdf(3, "body")) == []
    # handcrafted: a Text (non-Link) annot and a GoTo action must skip
    doctored = build_pdf(3, "body", False, links=("https://keep.org/",))
    doctored = doctored.replace(
        b"/Subtype /Link /Rect [72 700 300 714] /A << /S /URI /URI (https://keep.org/) >>",
        b"/Subtype /Link /Rect [0 0 1 1] /A << /S /GoTo /D (page2) >>",
    )
    assert extract_pdf_links(doctored) == []
    doctored2 = build_pdf(3, "body", False, links=("https://keep.org/",)).replace(
        b"/Subtype /Link", b"/Subtype /Text"
    )
    assert extract_pdf_links(doctored2) == []


def test_pdf_links_quarantine_fuzz():
    """Byte flips / truncations over a links-bearing fixture:
    extract_pdf_links returns a list or raises ValueError ONLY."""
    import random

    from esgopeta_spark.operators.pdf import build_pdf, extract_pdf_links

    rng = random.Random(0x9DF12)
    base = build_pdf(7, "fuzz text", True, links=("https://f.org/a", "https://f.org/b"))
    for trial in range(300):
        b = bytearray(base)
        if trial % 3 == 0:
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif trial % 3 == 1:
            b = b[: rng.randrange(1, len(b))]
        else:
            i = base.find(b"stream\n") + 7
            b[i + rng.randrange(10)] ^= 0xFF
        try:
            out = extract_pdf_links(bytes(b))
            assert isinstance(out, list)
        except ValueError:
            pass


def test_pdf_link_edges_stream_twin(spark, tmp_path):
    """pdf_link_edges is stateless: stream matches batch, poison rows
    quarantine visibly (pos=-1) without killing the batch."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.pdf import build_pdf, pdf_link_edges

    rows = [
        (0, build_pdf(0, "a", False, links=("https://h.org/0",))),
        (1, build_pdf(1, "b", True, links=("HTTPS://H.ORG:443/1?utm_x=1",))),
        (2, b"%PDF-1.4 garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, pdf: binary")
    want = {tuple(r) for r in pdf_link_edges(df).collect()}
    assert (0, 0, "https://h.org/0", "https://h.org/0") in want
    assert (1, 0, "HTTPS://H.ORG:443/1?utm_x=1", "https://h.org/1") in want
    assert (2, -1, "error", "") in want

    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "pdfl_in"))
    stream = spark.readStream.schema(df.schema).parquet(str(tmp_path / "pdfl_in"))
    q = (
        pdf_link_edges(stream)
        .writeStream.format("memory").queryName("pdflstream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM pdflstream").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# r12: font-aware decoding (/Differences, /ToUnicode, Type0, base
# encodings, glyph names, resource inheritance)
# ---------------------------------------------------------------------------


def _one_page_pdf(content: bytes, font_obj: bytes | None = None,
                  extra_objs: dict[int, bytes] | None = None,
                  resources_on_pages: bool = False) -> bytes:
    """Minimal classic-layout single-page PDF around ``content``; the
    optional font object registers as /F1 (on the page, or on the
    /Pages node when resources_on_pages)."""
    res = b" /Resources << /Font << /F1 7 0 R >> >>" if font_obj else b""
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids [3 0 R] /Count 1"
            + (res if resources_on_pages else b"") + b" >>"),
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
            + (res if font_obj and not resources_on_pages else b"") + b" >>"),
        4: (b"<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream"),
    }
    if font_obj:
        objs[7] = font_obj
    if extra_objs:
        objs.update(extra_objs)
    out = bytearray(b"%PDF-1.4\n")
    for num in sorted(objs):
        out += str(num).encode() + b" 0 obj\n" + objs[num] + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"  # fallback scan resolves
    return bytes(out)


def test_differences_array_remaps_codes():
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [65 /b /a /four 97 /exclam] >> >>")
    # codes: A->b, B->a, C->4, a->!, everything else base WinAnsi
    pdf = _one_page_pdf(b"BT /F1 12 Tf (ABCa zz) Tj ET", font)
    assert extract_pdf_text(pdf) == "ba4! zz"


def test_differences_glyph_name_forms():
    font = (b"<< /Type /Font /Subtype /Type1 "
            b"/Encoding << /Differences "
            b"[65 /uni0416 /u1F600 /eacute /fi /nosuchglyph] >> >>")
    pdf = _one_page_pdf(b"BT /F1 12 Tf (ABCDE) Tj ET", font)
    # uniXXXX, uXXXXX (astral), AGL accent, ligature expansion, unknown
    assert extract_pdf_text(pdf) == "Ж\U0001F600éfi�"


def test_base_encoding_names():
    mac = (b"<< /Type /Font /Subtype /Type1 "
           b"/Encoding /MacRomanEncoding >>")
    # 0x8E is eacute in MacRoman, aecute-ish in cp1252 (Z-caron there)
    pdf = _one_page_pdf(b"BT /F1 12 Tf (caf\x8e) Tj ET", mac)
    assert extract_pdf_text(pdf) == "café"
    std = (b"<< /Type /Font /Subtype /Type1 "
           b"/Encoding /StandardEncoding >>")
    pdf = _one_page_pdf(b"BT /F1 12 Tf (ok \x8e) Tj ET", std)
    # bounded StandardEncoding: printable ASCII identity, high -> U+FFFD
    assert extract_pdf_text(pdf) == "ok �"


def test_tounicode_bfchar_bfrange_and_array_form():
    cmap = (b"begincmap\n"
            b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            b"1 beginbfrange\n<1041> <1043> <0061>\nendbfrange\n"
            b"1 beginbfrange\n<2000> <2001> [<0058> <00590059>]\nendbfrange\n"
            b"1 beginbfchar\n<0007> <00410042>\nendbfchar\nendcmap")
    font = (b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
            b"/ToUnicode 8 0 R >>")
    extra = {8: (b"<< /Length " + str(len(cmap)).encode()
                 + b" >>\nstream\n" + cmap + b"\nendstream")}
    # codes: 1041->a 1042->b 1043->c (offset range), 2000->X 2001->YY
    # (array range, multi-char), 0007->AB (bfchar multi-char),
    # 9999 -> unmapped U+FFFD
    pdf = _one_page_pdf(
        b"BT /F1 12 Tf <104110421043200020010007 9999> Tj ET", font, extra)
    assert extract_pdf_text(pdf) == "abcXYYAB�"


def test_type0_without_tounicode_is_visible_fffd():
    font = b"<< /Type /Font /Subtype /Type0 /Encoding /Identity-H >>"
    pdf = _one_page_pdf(b"BT /F1 12 Tf <00410042> Tj ET", font)
    # glyph indices are NOT text without a CMap: per-code U+FFFD
    assert extract_pdf_text(pdf) == "��"


def test_resources_inherit_from_pages_node():
    font = (b"<< /Type /Font /Subtype /Type1 "
            b"/Encoding << /Differences [88 /Y] >> >>")
    pdf = _one_page_pdf(b"BT /F1 12 Tf (X) Tj ET", font,
                        resources_on_pages=True)
    assert extract_pdf_text(pdf) == "Y"


def test_unfonted_strings_keep_bom_winansi_contract():
    # no Tf before Tj: BOM'd UTF-16 and WinAnsi both still decode
    font = b"<< /Type /Font /Subtype /Type1 /Encoding << /Differences [97 /b] >> >>"
    pdf = _one_page_pdf(b"BT (a) Tj T* <FEFF0414> Tj T* /F1 1 Tf (a) Tj ET",
                        font)
    assert extract_pdf_text(pdf) == "a\nД\nb"


def test_fontmapped_fixture_round_trip_matrix():
    from esgopeta_spark.operators.pdf import (
        _rot_cipher, build_pdf_fontmapped)

    for did, t in [(0, ""), (5, "plain lower words"), (12, "digits 0159"),
                   (7, "Mixed CASE (and) escapes \\ here"),
                   (99, "a" * 500)]:
        got = extract_pdf_text(build_pdf_fontmapped(did, t))
        exp = f"Doc {did}\n" + (t + "\n" if t else "") + f"CID: {t}\nEnd."
        assert got == exp, (did, got[:80])
    # the cipher is an involution and NOT the identity on alnum: a
    # reader that ignores /Differences must see mojibake, not the text
    assert _rot_cipher(_rot_cipher("abz 019")) == "abz 019"
    assert _rot_cipher("abz 019") != "abz 019"


def test_fontmapped_fuzz_quarantine():
    """The r12 font paths obey the quarantine contract: seeded flips /
    truncations / splices over the font-mapped fixture return str or
    raise ValueError only."""
    from esgopeta_spark.operators.pdf import build_pdf_fontmapped

    rng = random.Random(0xF0117)
    base = build_pdf_fontmapped(3, "fuzz body for the font mapped fixture")
    for trial in range(400):
        b = bytearray(base)
        kind = trial % 4
        if kind == 0:
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif kind == 1:
            b = b[: rng.randrange(1, len(b))]
        elif kind == 2:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(16)) + b[i:]
        else:
            # target the CMap / Differences bytes specifically
            anchor = rng.choice([b"beginbfrange", b"/Differences", b"<1020>"])
            i = base.find(anchor)
            b[i + rng.randrange(len(anchor) + 24)] ^= 0xFF
        try:
            out = extract_pdf_text(bytes(b))
            assert isinstance(out, str)
        except ValueError:
            pass


def test_pdf_font_remap_entry_matches_kernel(spark):
    """The catalog entry's Spark pipeline equals the pure-python
    round trip on a small frame (the kernel IS the python function)."""
    from esgopeta_spark.operators.pdf import synth_pdf_fontmapped

    rows = [(0, "alpha beta"), (1, ""), (2, "gamma 42")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: (r["pdf_text"], r["n_lines"], r["n_pages"])
           for r in pdf_extract(synth_pdf_fontmapped(df)).collect()}
    for did, t in rows:
        exp = f"Doc {did}\n" + (t + "\n" if t else "") + f"CID: {t}\nEnd."
        assert got[did] == (exp, 4 if t else 3, 2), got[did]
