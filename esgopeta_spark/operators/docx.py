"""DOCX text extraction (r14) — the office-document ingest format a
real corpus pipeline meets right after HTML and PDF: a .docx is a ZIP
package (OPC) whose `word/document.xml` carries the text in
`<w:p>` paragraphs of `<w:r>` runs of `<w:t>` text nodes, with
`<w:tab/>` and `<w:br/>` as explicit whitespace controls and the
usual XML entity escaping.

Scope (documented, honest): the extractor walks the REAL zip
container (stdlib ``zipfile`` — the same in-container-library rule as
zlib for PNG), locates `word/document.xml`, and parses the WordprocessingML
subset that carries text — paragraphs, runs, text nodes
(including `xml:space="preserve"` whitespace), tabs, line/page
breaks, and table cells (`<w:tc>` content joins its paragraphs like
body paragraphs — tables READ as text, the C4 lineage choice).
Styling, numbering, headers/footers, embedded media and field codes
are ignored by design.  Malformed packages raise ValueError only
(quarantine contract; ``zipfile``'s BadZipFile converts).

The fixture twin (`synth_docx`) builds a deterministic package FROM
the corpus text with pinned zip metadata (no clock), so the DuckDB
oracle recomputes the extracted text's md5 in closed form — the
encoder-twin discipline."""

from __future__ import annotations

import io
import re
import zipfile

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>'
)

_DOC_HEAD = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    '<w:document xmlns:w="http://schemas.openxmlformats.org/'
    'wordprocessingml/2006/main"><w:body>'
)
_DOC_TAIL = "</w:body></w:document>"


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def synth_docx(doc_id: int, text: str) -> bytes:
    """Deterministic .docx from a corpus doc: three body paragraphs of
    corpus slices (one with a split-across-runs middle and an explicit
    tab, one with a line break), plus a 1x2 table whose cells carry a
    heading-ish literal and another slice — so the extractor must
    handle run joins, whitespace controls, entity escaping, and table
    cells to reproduce the closed-form expectation.  Zip metadata is
    pinned (no clock); id%23==1 ships a CORRUPTED central directory
    that must quarantine."""
    d = int(doc_id)
    t = re.sub(r"[\n\r]", " ", text or "")
    p1 = _xml_escape(t[0:40])
    p2a, p2b = _xml_escape(t[40:60]), _xml_escape(t[60:80])
    p3 = _xml_escape(t[80:120])
    cell = _xml_escape(t[120:150])
    body = (
        f"<w:p><w:r><w:t>{p1}</w:t></w:r></w:p>"
        f"<w:p><w:r><w:t xml:space=\"preserve\">{p2a}</w:t></w:r>"
        f"<w:r><w:tab/><w:t>{p2b}</w:t></w:r></w:p>"
        f"<w:p><w:r><w:t>slice&amp;{d}</w:t><w:br/>"
        f"<w:t>{p3}</w:t></w:r></w:p>"
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t>meta:</w:t></w:r></w:p></w:tc>"
        f"<w:tc><w:p><w:r><w:t>{cell}</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
    )
    xml = _DOC_HEAD + body + _DOC_TAIL
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("word/document.xml", xml),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, data)
    blob = buf.getvalue()
    if d % 23 == 1:
        # corrupt the central directory magic: a deterministic
        # BadZipFile on open, the visible-quarantine class
        eocd = blob.rfind(b"PK\x05\x06")
        blob = blob[:eocd] + b"XX" + blob[eocd + 2:]
    return blob


def synth_docx_expected_sql(text_expr: str = "coalesce(text, '')",
                            id_expr: str = "doc_id") -> str:
    """DuckDB expression: the text :func:`extract_docx_text` recovers
    from :func:`synth_docx`'s package, in closed form (escape/unescape
    cancels; runs join bare, tab/br become \\t and \\n, paragraphs and
    table cells join with \\n)."""
    clean = f"regexp_replace({text_expr}, '[\\n\\r]', ' ', 'g')"
    return (
        f"substr({clean}, 1, 40) || e'\\n' || "
        f"substr({clean}, 41, 20) || e'\\t' || substr({clean}, 61, 20) "
        f"|| e'\\n' || "
        f"'slice&' || {id_expr} || e'\\n' || substr({clean}, 81, 40) "
        f"|| e'\\n' || "
        f"'meta:' || e'\\n' || substr({clean}, 121, 30)"
    )


_TOKEN_RE = re.compile(
    r"<w:t(?:\s[^>]*)?>(.*?)</w:t>"      # text node (group 1)
    r"|<w:tab\s*/?>"                      # tab
    r"|<w:br\s*/?>|<w:cr\s*/?>"           # line break
    r"|</w:p\s*>",                        # paragraph end
    re.DOTALL,
)


def _xml_unescape(s: str) -> str:
    out = s.replace("&lt;", "<").replace("&gt;", ">")
    out = out.replace("&quot;", '"').replace("&apos;", "'")
    return out.replace("&amp;", "&")


def extract_docx_text(blob: bytes) -> str:
    """.docx bytes -> plain text: w:t nodes join within a paragraph,
    w:tab -> \\t, w:br / w:cr -> \\n, paragraph ends -> \\n (trailing
    newline trimmed).  Raises ValueError for anything that is not a
    well-formed package with a word/document.xml (quarantine
    contract)."""
    import zlib

    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            xml = z.read("word/document.xml").decode("utf-8")
    except (zipfile.BadZipFile, zipfile.LargeZipFile, zlib.error, KeyError,
            OSError, EOFError, UnicodeDecodeError) as exc:
        # the fuzz contract: corrupted deflate streams surface zlib.error
        # from inside zipfile's read — convert, never leak
        raise ValueError(f"bad docx package: {exc}") from exc
    parts: list[str] = []
    for m in _TOKEN_RE.finditer(xml):
        tok = m.group(0)
        if tok.startswith("<w:t") and not tok.startswith("<w:tab"):
            parts.append(_xml_unescape(m.group(1)))
        elif tok.startswith("<w:tab"):
            parts.append("\t")
        elif tok.startswith("<w:br") or tok.startswith("<w:cr"):
            parts.append("\n")
        else:  # paragraph end
            parts.append("\n")
    text = "".join(parts)
    return text[:-1] if text.endswith("\n") else text
