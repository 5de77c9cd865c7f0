"""DOCX extraction (r14): WordprocessingML token classes, whitespace
controls, entity escaping, table-cell text, the zip quarantine
contract, and fuzz."""

from __future__ import annotations

import random

import pytest

from esgopeta_spark.operators.docx import (
    extract_docx_text,
    synth_docx,
)


def _pack(xml_body: str) -> bytes:
    import io
    import zipfile

    from esgopeta_spark.operators.docx import (
        _CONTENT_TYPES,
        _DOC_HEAD,
        _DOC_TAIL,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("word/document.xml", _DOC_HEAD + xml_body + _DOC_TAIL)
    return buf.getvalue()


def test_token_classes():
    assert extract_docx_text(_pack(
        "<w:p><w:r><w:t>hello</w:t></w:r></w:p>")) == "hello"
    # runs join bare; tab and br are explicit whitespace
    assert extract_docx_text(_pack(
        "<w:p><w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t>"
        "<w:br/><w:t>c</w:t></w:r></w:p>")) == "a\tb\nc"
    # entities unescape, ampersand LAST (no double-decode)
    assert extract_docx_text(_pack(
        "<w:p><w:r><w:t>&amp;lt; &lt;x&gt; &quot;q&quot;</w:t></w:r>"
        "</w:p>")) == '&lt; <x> "q"'
    # xml:space preserve attribute form
    assert extract_docx_text(_pack(
        '<w:p><w:r><w:t xml:space="preserve">  padded  </w:t></w:r>'
        "</w:p>")) == "  padded  "
    # paragraphs and table cells newline-join
    assert extract_docx_text(_pack(
        "<w:p><w:r><w:t>p1</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>c1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>c2</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
    )) == "p1\nc1\nc2"
    # empty document
    assert extract_docx_text(_pack("")) == ""


def test_quarantine_contract():
    blob = synth_docx(7, "some corpus text " * 20)
    assert extract_docx_text(blob)  # sane baseline
    with pytest.raises(ValueError):
        extract_docx_text(b"not a zip at all")
    with pytest.raises(ValueError):
        extract_docx_text(synth_docx(24, "x" * 200))  # 24%23==1 poison
    # a zip WITHOUT word/document.xml quarantines (KeyError class)
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.xml", "<x/>")
    with pytest.raises(ValueError):
        extract_docx_text(buf.getvalue())


def test_quarantine_fuzz():
    base = synth_docx(3, "corpus words here " * 30)
    rng = random.Random(0xD0C)
    for trial in range(300):
        fb = bytearray(base)
        if trial % 3 == 0:
            fb = fb[: rng.randrange(1, len(fb))]
        else:
            for _ in range(rng.randrange(1, 5)):
                fb[rng.randrange(len(fb))] = rng.randrange(256)
        try:
            out = extract_docx_text(bytes(fb))
            assert isinstance(out, str)
        except ValueError:
            pass
