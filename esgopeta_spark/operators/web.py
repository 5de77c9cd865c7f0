"""Crawl front-end (G4 — where a real pretraining pipeline STARTS):
from-scratch HTML->text extraction and URL canonicalization + dedup.

C4 (Raffel et al. 2020 §2.1) and CCNet (Wenzek et al. 2020 §3) both
begin at raw web pages — Common Crawl WET-style plain-text extraction —
before any of the rule batteries / line dedup / selection stages this
repo already ships.  This module supplies that missing first stage:

- ``extract_html_text``: a total (never-raising) single-pass HTML
  tokenizer — strips comments / doctypes / processing instructions,
  drops <script>/<style>/<textarea> raw-text content, drops boilerplate
  subtrees (<nav>/<header>/<footer>/<aside>/<noscript>/<template>/
  <svg>/<iframe>), segments block elements to lines, decodes character
  references (named table + numeric with the HTML5 windows-1252 C1
  remap), and collapses ASCII whitespace runs per line.  Quoted ``>``
  inside attribute values does not terminate a tag; malformed input
  degrades gracefully (unterminated constructs drop the tail, a stray
  ``<`` is literal text) — at 100 TB a poison page must cost its own
  text, never the stage.
- ``canonicalize_url``: scheme/host lowercasing, default-port and
  fragment strip, tracking-parameter removal (utm_* and the usual
  click-id suspects), percent-decode normalization (unreserved chars
  decode, everything else uppercases its hex), empty-param cleanup and
  a sorted stable query order — so syntactic variants of one resource
  dedup to one canonical key for the exact-dup keeper machinery
  (operators/dedup.py).

Both kernels are pure ``str -> str`` so the same function runs inside
Arrow-batched pandas_udfs on executors (batch AND streams — stateless
projections need no streaming mirror) and in local oracle tests.

Oracle strategy (the FLAC encoder-twin pattern): ``synth_html`` /
``synth_url_variants`` build deterministic fixtures FROM the corpus in
pure codegen, the kernels must invert them, and DuckDB recomputes the
expected output in closed form from the source text — hash-exact,
no HTML parser on the oracle side.

Reference parity note: the reference engine (cretz/esgopeta) has no web
surface at all; this implements the mandated LLM-data-pipeline stage
per the round-9 verdict (VERDICT.md "Next round" #1/#2).
"""

from __future__ import annotations

import re
import string

import pandas as pd  # module-level so pandas_udf type hints resolve under PEP 563

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HTML -> text extraction
# ---------------------------------------------------------------------------

# named character references (the common-web subset; HTML5 full table is
# ~2k names — extend as corpora demand)
_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ", "copy": "©", "reg": "®", "trade": "™",
    "mdash": "—", "ndash": "–", "hellip": "…",
    "lsquo": "‘", "rsquo": "’", "ldquo": "“",
    "rdquo": "”", "laquo": "«", "raquo": "»",
    "middot": "·", "bull": "•", "deg": "°",
    "plusmn": "±", "times": "×", "divide": "÷",
    "frac12": "½", "frac14": "¼", "sup2": "²",
    "sup3": "³", "sect": "§", "para": "¶",
    "dagger": "†", "euro": "€", "pound": "£",
    "yen": "¥", "cent": "¢", "eacute": "é",
    "egrave": "è", "agrave": "à", "ccedil": "ç",
    "uuml": "ü", "ouml": "ö", "auml": "ä",
    "szlig": "ß", "ntilde": "ñ", "shy": "",
}

# HTML5 numeric character references 0x80-0x9F remap through
# windows-1252 (WHATWG spec "numeric character reference end state")
_C1_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}

# raw-text elements: content runs to the matching close tag, no nested
# markup (HTML5 §13.2.5 "script data" / "RAWTEXT" states)
_RAW_TEXT = frozenset({"script", "style", "textarea"})

# boilerplate subtrees a WET-style extractor drops wholesale
_DROP_SUBTREE = frozenset(
    {"nav", "header", "footer", "aside", "noscript", "template", "svg",
     "iframe"}
)

# block-level elements: entering or leaving one breaks the text line
_BLOCK = frozenset(
    {"html", "head", "body", "title", "p", "div", "br", "hr", "li", "ul",
     "ol", "dl", "dt", "dd", "h1", "h2", "h3", "h4", "h5", "h6", "table",
     "thead", "tbody", "tfoot", "tr", "td", "th", "caption", "section",
     "article", "main", "blockquote", "pre", "figure", "figcaption",
     "address", "center", "form", "fieldset", "legend", "details",
     "summary", "select", "option"}
)

# ASCII whitespace ONLY (matches RE2's explicit class in the oracle SQL;
# Python \s would also eat unicode spaces DuckDB's \s does not)
_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")


def decode_entities(s: str) -> str:
    """Decode HTML character references: the named table above, decimal
    ``&#NNN;`` and hex ``&#xHH;`` (with the windows-1252 C1 remap and
    U+FFFD for NUL/surrogate/out-of-range per HTML5).  Anything
    unrecognized — or an ``&`` with no ``;`` within 32 chars — stays a
    literal ``&``."""
    if "&" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "&":
            nxt = s.find("&", i)
            if nxt < 0:
                out.append(s[i:])
                break
            out.append(s[i:nxt])
            i = nxt
            continue
        j = s.find(";", i + 1, i + 32)
        if j < 0:
            out.append(c)
            i += 1
            continue
        body = s[i + 1 : j]
        if body.startswith("#"):
            num = body[1:]
            try:
                cp = int(num[1:], 16) if num[:1] in ("x", "X") else int(num)
            except ValueError:
                out.append(c)
                i += 1
                continue
            cp = _C1_REMAP.get(cp, cp)
            if cp <= 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                out.append("�")
            else:
                out.append(chr(cp))
            i = j + 1
        elif body in _NAMED_ENTITIES:
            out.append(_NAMED_ENTITIES[body])
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def extract_html_blocks(html: str) -> list[tuple[str, str]]:
    """HTML -> list of (block_text, anchor_text) — one entry per
    non-empty text line (block-element segmentation), with the portion
    of the line that sat inside ``<a>`` elements collapsed separately
    (the jusText/trafilatura link-density signal: boilerplate blocks —
    menus, tag clouds, pagination — are mostly anchor text).  Entities
    decoded, ASCII whitespace collapsed, boilerplate subtrees and
    raw-text element content dropped.  TOTAL on any str input — a
    malformed page degrades (tail after an unterminated construct is
    dropped; a stray ``<`` is literal text), it never raises."""
    n = len(html)
    lower = html.lower()
    i = 0
    drop = 0  # nesting depth of _DROP_SUBTREE elements
    anchor = 0  # nesting depth of <a> elements
    buf: list[str] = []
    abuf: list[str] = []
    blocks: list[tuple[str, str]] = []

    def flush() -> None:
        if not buf:
            abuf.clear()
            return
        line = _WS_RUN.sub(" ", decode_entities("".join(buf))).strip(" ")
        atext = _WS_RUN.sub(" ", decode_entities("".join(abuf))).strip(" ")
        buf.clear()
        abuf.clear()
        if line:
            blocks.append((line, atext))

    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            if drop == 0:
                buf.append(html[i:])
                if anchor:
                    abuf.append(html[i:])
            break
        if lt > i and drop == 0:
            buf.append(html[i:lt])
            if anchor:
                abuf.append(html[i:lt])
        i = lt
        nxt = html[i + 1 : i + 2]
        if nxt == "!":
            if html.startswith("<!--", i):
                e = html.find("-->", i + 4)
                i = n if e < 0 else e + 3
            else:  # doctype / CDATA / bogus comment: to the next '>'
                e = html.find(">", i + 2)
                i = n if e < 0 else e + 1
            continue
        if nxt == "?":  # processing instruction
            e = html.find(">", i + 2)
            i = n if e < 0 else e + 1
            continue
        if not (nxt.isalpha() or nxt == "/"):
            if drop == 0:
                buf.append("<")  # literal '<' in text (incl. '<' at EOF)
                if anchor:
                    abuf.append("<")
            i += 1
            continue
        closing = nxt == "/"
        j = i + (2 if closing else 1)
        k = j
        while k < n and (html[k].isalnum() or html[k] in "-:"):
            k += 1
        name = lower[j:k]
        # scan to the tag's '>' respecting quoted attribute values
        q = None
        e = k
        while e < n:
            c = html[e]
            if q:
                if c == q:
                    q = None
            elif c in "\"'":
                q = c
            elif c == ">":
                break
            e += 1
        if e >= n:  # unterminated tag: drop the tail
            break
        self_closing = html[e - 1] == "/"
        i = e + 1
        if not closing and not self_closing and name in _RAW_TEXT:
            flush()
            e2 = lower.find("</" + name, i)
            if e2 < 0:
                i = n
                break
            e3 = html.find(">", e2)
            i = n if e3 < 0 else e3 + 1
            continue
        if name in _DROP_SUBTREE:
            flush()
            if closing:
                drop = max(drop - 1, 0)
            elif not self_closing:
                drop += 1
            continue
        if name == "a":
            if closing:
                anchor = max(anchor - 1, 0)
            elif not self_closing:
                anchor += 1
            continue
        if name in _BLOCK:
            flush()
            anchor = 0  # block boundary closes any dangling anchor
        # inline elements (b, span, em, ...): no line break, no text
    flush()
    return blocks


def extract_html_text(html: str) -> str:
    """HTML -> WET-style plain text: one line per block element (the
    block walker above), lines joined by newlines."""
    return "\n".join(b[0] for b in extract_html_blocks(html))


def html_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) -> (id, clean_text, n_lines) via an Arrow-batched
    pandas_udf around :func:`extract_html_text`; n_lines is a codegen
    split-size so only the extraction itself pays the Python kernel.
    Stateless projection — runs on streams AS-IS (the
    banded_signatures pattern: share, don't mirror)."""

    @F.pandas_udf("string")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(lambda h: extract_html_text(h) if isinstance(h, str) else "")

    out = df.select(F.col(id_col), _extract(F.col(html_col)).alias("clean_text"))
    return out.select(
        id_col,
        "clean_text",
        F.when(F.col("clean_text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("clean_text"), "\n", -1)))
        .cast("int")
        .alias("n_lines"),
    )


def html_blocks(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) -> one row per text block: (id, block_idx, block_text,
    n_words, anchor_milli) where anchor_milli is the jusText-style link
    density (chars inside <a> per 1000 line chars, integer div).  One
    Arrow kernel + posexplode; the density/word math is codegen."""

    @F.pandas_udf("array<struct<text: string, atext: string>>")
    def _blocks(s: pd.Series) -> pd.Series:
        return s.map(
            lambda h: [
                {"text": t, "atext": a} for t, a in extract_html_blocks(h)
            ]
            if isinstance(h, str)
            else []
        )

    ex = df.select(
        F.col(id_col),
        F.posexplode(_blocks(F.col(html_col))).alias("block_idx", "_b"),
    )
    return ex.select(
        id_col,
        F.col("block_idx").cast("int").alias("block_idx"),
        F.col("_b.text").alias("block_text"),
        F.size(F.split(F.col("_b.text"), " ", -1)).cast("int").alias("n_words"),
        F.expr("(length(_b.atext) * 1000) div length(_b.text)")
        .cast("bigint")
        .alias("anchor_milli"),
    )


def classify_blocks(
    blocks: DataFrame, min_words: int = 8, max_anchor_milli: int = 333
) -> DataFrame:
    """Append the jusText-core block class: 'short' (below the word
    floor), 'boilerplate' (link density above the ceiling — menus, tag
    clouds, pagination), else 'content'.  (Full jusText also scores
    stopword density and smooths by neighbors; length + link density
    are its two load-bearing signals and keep the classifier a pure
    codegen projection.)"""
    return blocks.withColumn(
        "cls",
        F.when(F.col("n_words") < min_words, F.lit("short"))
        .when(F.col("anchor_milli") > max_anchor_milli, F.lit("boilerplate"))
        .otherwise(F.lit("content")),
    )


# --- fixture twin (codegen) -------------------------------------------------

# the entity-laden fixture line exercises named + decimal + hex
# references (incl. multi-byte decodes) through the graded path; its
# decoded form is a CONSTANT the oracle emits literally
ENTITY_LINE_HTML = (
    "<p>Q&amp;A &mdash; caf&eacute; &#8364;5 &lt;em&gt; &#x263A; &copy;</p>"
)
ENTITY_LINE_TEXT = "Q&A — café €5 <em> ☺ ©"


def escape_html_text(col: F.Column) -> F.Column:
    """Codegen &/</> escaping — the encoder half of the round trip."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


# the fixture page's literal chunks — shared by the codegen builder AND
# the SQL generator below, so the oracle reconstructs the page
# byte-identically from one source of truth
_PAGE_HEAD = "<html><head><title>Doc "
_PAGE_MID1 = (
    '</title><meta charset="utf-8">'
    '<script type="text/javascript">var s = "</div> <p>not text</p>";'
    ' if (1 < 2) { s += "&amp;"; }</script>'
    "<style>p > a { color: #fff; }</style></head>"
    '<body><nav><ul><li><a href="/">Home</a></li>'
    '<li><a href="/about?a=1&amp;b=2">About</a></li></ul></nav>'
    "<!-- boilerplate <p>comment</p> -->"
    '<div id="main" data-note="a > b"><p>'
)
_PAGE_MID2 = "</p>" + ENTITY_LINE_HTML + "<p>Length: "
_PAGE_TAIL = (
    "</p></div><footer>&copy; 2026 Example &middot; "
    '<a href="#terms">Terms</a></footer></body></html>'
)


def synth_html(doc_id_col: F.Column, text_col: F.Column) -> F.Column:
    """Deterministic fixture page per doc, pure codegen: title carrying
    the doc id, script/style with adversarial content (a quoted
    ``</div>``, an unescaped ``<``), nav/footer boilerplate, a comment
    wrapping fake markup, a quoted ``>`` attribute, the escaped corpus
    text, the entity fixture line, and a closed-form trailer — so
    ``extract_html_text`` must exercise every drop/segment/decode rule
    to reproduce the oracle's closed-form expectation."""
    return F.concat(
        F.lit(_PAGE_HEAD),
        doc_id_col.cast("string"),
        F.lit(_PAGE_MID1),
        escape_html_text(text_col),
        F.lit(_PAGE_MID2),
        F.length(text_col).cast("string"),
        F.lit(_PAGE_TAIL),
    )


def synth_html_sql(text_expr: str = "coalesce(text, '')", id_expr: str = "doc_id") -> str:
    """DuckDB expression reconstructing ``synth_html``'s page string
    byte-identically (built from the same literal chunks), so an oracle
    can take md5/octet_length of the exact payload."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    esc = (
        f"replace(replace(replace({text_expr}, '&', '&amp;'),"
        " '<', '&lt;'), '>', '&gt;')"
    )
    return (
        f"{q(_PAGE_HEAD)} || {id_expr} || {q(_PAGE_MID1)} || {esc} || "
        f"{q(_PAGE_MID2)} || length({text_expr}) || {q(_PAGE_TAIL)}"
    )


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------

_TRACKING_EXACT = frozenset(
    {"fbclid", "gclid", "yclid", "msclkid", "mc_cid", "mc_eid", "igshid",
     "spm", "ref_src", "wt_mc", "icid"}
)
_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443",
                  "ftp": "21"}
_UNRESERVED = frozenset(string.ascii_letters + string.digits + "-._~")
_URL_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)


def _pct_norm(s: str) -> str:
    """Percent-decode unreserved characters; uppercase the hex of every
    other escape (RFC 3986 §6.2.2 normalization)."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 2 < n + 1:
            hx = s[i + 1 : i + 3]
            if len(hx) == 2 and hx[0] in string.hexdigits and hx[1] in string.hexdigits:
                ch = chr(int(hx, 16))
                out.append(ch if ch in _UNRESERVED else "%" + hx.upper())
                i += 3
                continue
        out.append(c)
        i += 1
    return "".join(out)


def canonicalize_url(url: str) -> str:
    """One canonical form per resource: lowercase scheme+host, trailing
    host dot and default port stripped, fragment stripped, tracking
    params (utm_* prefix + the exact-name click-id set) removed, empty
    query segments dropped, remaining params percent-normalized and
    sorted (stable canonical order), path percent-normalized with ``/``
    for empty.  A string that doesn't parse as scheme://... returns
    trimmed as-is (never raises)."""
    u = url.strip()
    m = _URL_RE.match(u)
    if m is None:
        return u
    scheme, hostport, path, query = m.groups()
    scheme = scheme.lower()
    host, sep, port = hostport.lower().partition(":")
    host = host.rstrip(".")
    if not host.isascii():
        # IDN: non-ASCII labels fold to their punycode ACE form (RFC
        # 3490 via the stdlib idna codec) so 'münchen.example' and its
        # xn-- wire form dedup to ONE canonical key; an unencodable
        # label keeps the host as-is (total, never raises)
        try:
            host = ".".join(
                l if l.isascii() else l.encode("idna").decode("ascii")
                for l in host.split(".")
            )
        except UnicodeError:
            pass
    if not sep or port == _DEFAULT_PORTS.get(scheme) or port == "":
        hostport = host
    else:
        hostport = host + ":" + port
    path = _pct_norm(path) or "/"
    params = []
    if query:
        for part in query.split("&"):
            if not part:
                continue
            k, eq, v = part.partition("=")
            kl = k.lower()
            if kl.startswith("utm_") or kl in _TRACKING_EXACT:
                continue
            params.append(_pct_norm(k) + (("=" + _pct_norm(v)) if eq else ""))
    params.sort()
    out = scheme + "://" + hostport + path
    if params:
        out += "?" + "&".join(params)
    return out


def url_canonicalize(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canon"
) -> DataFrame:
    """Append the canonical form of ``url_col`` via an Arrow kernel.
    Stateless — batch and streams share this projection."""

    @F.pandas_udf("string")
    def _canon(s: pd.Series) -> pd.Series:
        return s.map(lambda u: canonicalize_url(u) if isinstance(u, str) else "")

    return df.withColumn(out_col, _canon(F.col(url_col)))


def extract_links_rel(html: str) -> list[tuple[str, int]]:
    """All ``<a>`` hrefs in document order with their ``rel=nofollow``
    flag (1 when the anchor's rel token list carries ``nofollow`` or
    its SEO cousins ``ugc``/``sponsored`` — rel-attributes every polite
    link-graph builder honors), duplicates kept (edge multiplicity is
    real signal).  Quote-aware tag scanner; total on any str.  Links
    inside dropped subtrees (nav menus) ARE returned — a link graph
    wants the page's full out-edges even where the TEXT is
    boilerplate."""
    out: list[tuple[str, int]] = []
    lower = html.lower()
    i, n = 0, len(html)
    while True:
        i = lower.find("<a", i)
        if i < 0:
            break
        j = i + 2
        if j < n and (html[j].isalnum() or html[j] in "-:"):
            i = j  # <abbr>, <article>, ... — not an anchor
            continue
        # scan to '>' respecting quotes, collecting attributes
        q, e = None, j
        while e < n:
            c = html[e]
            if q:
                if c == q:
                    q = None
            elif c in "\"'":
                q = c
            elif c == ">":
                break
            e += 1
        if e >= n:
            break  # unterminated tag: no link (matches the extractor)
        attrs = html[j:e]
        m = re.search(
            r"""href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", attrs, re.IGNORECASE
        )
        if m:
            rel = re.search(
                r"""rel\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                attrs,
                re.IGNORECASE,
            )
            tokens = (
                (rel.group(2) or rel.group(3) or rel.group(4) or "")
                .lower()
                .split()
                if rel
                else []
            )
            nofollow = int(
                bool({"nofollow", "ugc", "sponsored"} & set(tokens))
            )
            # attribute values carry character references ('&amp;' is the
            # CORRECT way to write '&' in an href) — decode them
            out.append(
                (
                    decode_entities(
                        m.group(2) or m.group(3) or m.group(4) or ""
                    ),
                    nofollow,
                )
            )
        i = e + 1 if e < n else n
    return out


def extract_links(html: str) -> list[str]:
    """All ``<a>`` hrefs, document order, duplicates kept — the
    rel-blind view of :func:`extract_links_rel` (one scanner, two
    projections)."""
    return [h for h, _nf in extract_links_rel(html)]


def meta_robots(html: str) -> tuple[int, int]:
    """(noindex, nofollow) from the page's ``<meta name=robots>`` tags
    — the robots META standard every indexer honors: directives are a
    comma-separated case-insensitive token list; ``none`` means
    ``noindex, nofollow``; multiple robots metas UNION (the
    most-restrictive-wins crawler rule); name matching is exact
    ``robots`` (a ``googlebot``-scoped meta is for someone else).
    Total on any str."""
    noindex = nofollow = 0
    lower = html.lower()
    i, n = 0, len(html)
    while True:
        i = lower.find("<meta", i)
        if i < 0:
            break
        j = i + 5
        if j < n and (html[j].isalnum() or html[j] in "-:"):
            i = j
            continue
        q, e = None, j
        while e < n:
            c = html[e]
            if q:
                if c == q:
                    q = None
            elif c in "\"'":
                q = c
            elif c == ">":
                break
            e += 1
        if e >= n:
            break  # unterminated tag drops the tail
        attrs = html[j:e]
        name = re.search(
            r"""name\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", attrs, re.IGNORECASE
        )
        if name and (
            (name.group(2) or name.group(3) or name.group(4) or "")
            .strip()
            .lower()
            == "robots"
        ):
            content = re.search(
                r"""content\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                attrs,
                re.IGNORECASE,
            )
            tokens = {
                t.strip()
                for t in (
                    content.group(2) or content.group(3) or content.group(4) or ""
                )
                .lower()
                .split(",")
            } if content else set()
            if "none" in tokens:
                noindex = nofollow = 1
            if "noindex" in tokens:
                noindex = 1
            if "nofollow" in tokens:
                nofollow = 1
        i = e + 1
    return noindex, nofollow


def policy_link_edges(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "base_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Link-graph edges under crawl POLICY: every out-edge resolved and
    canonicalized (as :func:`link_edges`) plus the three flags that
    gate what a polite crawler/indexer does with it — the page's meta
    robots (noindex, nofollow) and the anchor's own rel=nofollow —
    fused into ``follow`` (edge eligible for frontier expansion: page
    AND anchor allow it).  Page-level flags ride every edge so the
    downstream groupBy needs no second join.  One Arrow kernel +
    explode, shuffle-free; stateless (stream-safe)."""

    @F.pandas_udf(
        "array<struct<href: string, url_canon: string, anchor_nofollow: int,"
        " page_noindex: int, page_nofollow: int>>"
    )
    def _edges(html: pd.Series, base: pd.Series) -> pd.Series:
        def one(h, b):
            h = h if isinstance(h, str) else ""
            b = b if isinstance(b, str) else ""
            ni, nf = meta_robots(h)
            return [
                {
                    "href": href,
                    "url_canon": canonicalize_url(resolve_url(b, href)),
                    "anchor_nofollow": anf,
                    "page_noindex": ni,
                    "page_nofollow": nf,
                }
                for href, anf in extract_links_rel(h)
            ]

        return pd.Series([one(h, b) for h, b in zip(html, base)])

    return (
        df.select(F.col(id_col), F.explode(_edges(F.col(html_col), F.col(base_col))).alias("e"))
        .select(
            id_col, "e.href", "e.url_canon", "e.anchor_nofollow",
            "e.page_noindex", "e.page_nofollow",
            (
                (F.col("e.page_nofollow") == 0) & (F.col("e.anchor_nofollow") == 0)
            ).cast("int").alias("follow"),
        )
    )


def extract_canonical(html: str) -> str:
    """The page's ``<link rel=canonical>`` href — the site-declared
    dedup key (Google's canonicalization contract; RFC 6596).  First
    matching link in document order wins (the WHATWG rule for repeated
    metadata); ``rel`` is a case-insensitive space-separated token list
    so ``rel="alternate canonical"`` matches; attribute quoting/case
    follow the same quote-aware scanner as the anchor extractor;
    character references in the href decode.  Returns '' when the page
    declares nothing.  Total on any str."""
    lower = html.lower()
    i, n = 0, len(html)
    while True:
        i = lower.find("<link", i)
        if i < 0:
            return ""
        j = i + 5
        if j < n and (html[j].isalnum() or html[j] in "-:"):
            i = j
            continue
        q, e = None, j
        while e < n:
            c = html[e]
            if q:
                if c == q:
                    q = None
            elif c in "\"'":
                q = c
            elif c == ">":
                break
            e += 1
        if e >= n:
            return ""  # unterminated tag drops the tail
        attrs = html[j:e]
        rel = re.search(
            r"""rel\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", attrs, re.IGNORECASE
        )
        tokens = (
            (rel.group(2) or rel.group(3) or rel.group(4) or "").lower().split()
            if rel
            else []
        )
        if "canonical" in tokens:
            href = re.search(
                r"""href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                attrs,
                re.IGNORECASE,
            )
            if href:
                return decode_entities(
                    href.group(2) or href.group(3) or href.group(4) or ""
                )
            return ""  # canonical link without href: declares nothing
        i = e + 1


_REFRESH_RX = re.compile(
    r"^\s*(\d+)(?:\.(\d*))?\s*(?:[;,]\s*(?:url\s*=\s*)?(.*))?$",
    re.IGNORECASE | re.DOTALL,
)


def extract_meta_refresh(html: str) -> tuple[int, str] | None:
    """The page's ``<meta http-equiv=refresh>`` directive — the
    CLIENT-side redirect class HTTP-status collapse never sees (real
    crawls meet it constantly on moved pages and interstitials):
    returns (delay_milli, target-href) or None.  Parsing follows the
    WHATWG shared declarative refresh steps, simplified: first
    matching meta wins; content is ``delay [;|, [url=] target]``;
    the delay parses digit-wise to integer milli (never through a
    float); a quoted target unquotes; a delay with no target refreshes
    the page itself (target '').  Total on any str."""
    lower = html.lower()
    i, n = 0, len(html)
    while True:
        i = lower.find("<meta", i)
        if i < 0:
            return None
        j = i + 5
        if j < n and (html[j].isalnum() or html[j] in "-:"):
            i = j
            continue
        q, e = None, j
        while e < n:
            c = html[e]
            if q:
                if c == q:
                    q = None
            elif c in "\"'":
                q = c
            elif c == ">":
                break
            e += 1
        if e >= n:
            return None  # unterminated tag drops the tail
        attrs = html[j:e]
        he = re.search(
            r"""http-equiv\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
            attrs,
            re.IGNORECASE,
        )
        if he and (
            (he.group(2) or he.group(3) or he.group(4) or "").strip().lower()
            == "refresh"
        ):
            content = re.search(
                r"""content\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                attrs,
                re.IGNORECASE,
            )
            raw = (
                content.group(2) or content.group(3) or content.group(4) or ""
            ) if content else ""
            m = _REFRESH_RX.match(decode_entities(raw))
            if m is None:
                return None  # malformed directive declares nothing
            whole, frac = m.group(1), (m.group(2) or "")
            milli = int(whole) * 1000 + int((frac + "000")[:3] or 0)
            target = (m.group(3) or "").strip()
            if len(target) >= 2 and target[0] in "\"'" and target[-1] == target[0]:
                target = target[1:-1].strip()
            return milli, target
        i = e + 1


def meta_refresh_edges(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "base_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Client-side redirect edges: pages declaring a meta refresh emit
    (id, delay_milli, target href, canonical target) — resolved against
    the page URL with the shared RFC 3986 kernel, so these edges union
    straight into ``collapse_redirects`` beside the 3xx edges.  A
    refresh with no target (self-reload) and pages without the
    directive emit nothing.  One Arrow kernel + explode, shuffle-free;
    stateless (stream-safe)."""

    @F.pandas_udf(
        "array<struct<delay_milli: bigint, href: string, url_canon: string>>"
    )
    def _edges(html: pd.Series, base: pd.Series) -> pd.Series:
        def one(h, b):
            r = extract_meta_refresh(h if isinstance(h, str) else "")
            if r is None or not r[1]:
                return []
            milli, target = r
            return [{
                "delay_milli": milli,
                "href": target,
                "url_canon": canonicalize_url(
                    resolve_url(b if isinstance(b, str) else "", target)
                ),
            }]

        return pd.Series([one(h, b) for h, b in zip(html, base)])

    return (
        df.select(F.col(id_col), F.explode(_edges(F.col(html_col), F.col(base_col))).alias("e"))
        .select(id_col, "e.delay_milli", "e.href", "e.url_canon")
    )


def canonical_hints(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Append the site-declared canonical URL: extract the page's
    rel=canonical href, resolve it against the page URL (RFC 3986
    §5.2), canonicalize; a page declaring nothing is its own canonical
    (the fallback every dedup pipeline uses).  Stateless Arrow kernel —
    batch and streams share this projection."""

    @F.pandas_udf("string")
    def _canon(html: pd.Series, url: pd.Series) -> pd.Series:
        def one(h, u):
            u = u if isinstance(u, str) else ""
            href = extract_canonical(h if isinstance(h, str) else "")
            if not href:
                return canonicalize_url(u)
            return canonicalize_url(resolve_url(u, href))

        return pd.Series([one(h, u) for h, u in zip(html, url)])

    return df.withColumn(out_col, _canon(F.col(html_col), F.col(url_col)))


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4: resolve ``.`` / ``..`` segments in a path."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
        else:
            out.append(seg)
    # preserve a trailing slash for trailing '.'/'..'
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res


def resolve_url(base: str, href: str) -> str:
    """RFC 3986 §5.2 relative resolution (strict): absolute hrefs pass
    through, ``//host`` takes the base scheme, ``/path`` the base
    origin, relative paths merge with the base path's directory,
    ``?query`` keeps the base path, ``#frag`` keeps base path+query.
    Dot segments removed.  A base that doesn't parse returns the href
    unchanged (total, never raises)."""
    m = _URL_RE.match(base.strip())
    if m is None:
        return href
    b_scheme, b_host, b_path, b_query = m.groups()
    h = href.strip()
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", h):
        return h  # absolute (any scheme)
    frag = ""
    if "#" in h:
        h, _, frag_body = h.partition("#")
        frag = "#" + frag_body
    if h.startswith("//"):
        return b_scheme + ":" + h + frag
    if not h:
        return (
            b_scheme + "://" + b_host + (b_path or "/")
            + (("?" + b_query) if b_query else "") + frag
        )
    if h.startswith("/"):
        path, _, query = h.partition("?")
        return (
            b_scheme + "://" + b_host + remove_dot_segments(path)
            + (("?" + query) if query else "") + frag
        )
    if h.startswith("?"):
        return b_scheme + "://" + b_host + (b_path or "/") + h + frag
    # relative path: merge with the base path's directory
    path, _, query = h.partition("?")
    base_dir = (b_path or "/").rpartition("/")[0] + "/"
    return (
        b_scheme + "://" + b_host + remove_dot_segments(base_dir + path)
        + (("?" + query) if query else "") + frag
    )


def link_edges(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "base_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, base, html) -> one row per out-link: (id, href, url_canon)
    where url_canon = canonicalize(resolve(base, href)) — the crawl
    frontier / link-graph edge projection.  One Arrow kernel emitting
    the resolved array, then a codegen explode; stateless (stream-safe)."""

    @F.pandas_udf("array<struct<href: string, url: string>>")
    def _links(html: pd.Series, base: pd.Series) -> pd.Series:
        def one(h, b):
            if not isinstance(h, str):
                return []
            b = b if isinstance(b, str) else ""
            return [
                {"href": l, "url": canonicalize_url(resolve_url(b, l))}
                for l in extract_links(h)
            ]

        return pd.Series([one(h, b) for h, b in zip(html, base)])

    return (
        df.select(
            F.col(id_col), F.explode(_links(F.col(html_col), F.col(base_col))).alias("lk")
        )
        .select(id_col, "lk.href", F.col("lk.url").alias("url_canon"))
    )


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — crawl-frontier politeness filter
# ---------------------------------------------------------------------------


def parse_robots(text: str) -> list[tuple[str, str, str]]:
    """robots.txt -> [(agent, 'allow'|'disallow'|'crawl-delay', value)]
    rule rows.  RFC 9309 grouping: consecutive User-agent lines open a
    group whose rules apply to every listed agent; comments (#) and
    unknown directives are ignored; agents lowercase.  ``crawl-delay``
    (r11 — not in RFC 9309 but honored by real crawlers and emitted by
    real sites) rides the same grouping with its seconds value kept as
    the raw string (:func:`crawl_delay_milli` parses it digit-wise).
    Total on any str."""
    rules: list[tuple[str, str, str]] = []
    agents: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                agents = []
            agents.append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key in ("allow", "disallow", "crawl-delay"):
            for a in agents:
                rules.append((a, key, val))
    return rules


def robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives of a robots.txt, document order — per
    the sitemaps.org protocol these live OUTSIDE agent groups (they
    apply to every crawler), so this is a plain line scan: case-
    insensitive key, comments stripped, values trimmed, empties
    dropped.  THE seed source for :func:`expand_sitemap_frontier` —
    robots.txt is where real crawlers find a site's sitemaps.  Total
    on any str."""
    out: list[str] = []
    if not isinstance(text, str):
        return out
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, sep, val = line.partition(":")
        if sep and key.strip().lower() == "sitemap":
            val = val.strip()
            if val:
                out.append(val)
    return out


_DELAY_VAL_RX = re.compile(r"^(\d+)(?:\.(\d+))?$")


def crawl_delay_milli(
    rules: list[tuple[str, str, str]], agent: str, default: int = 0
) -> int:
    """Crawl-delay for ``agent`` as integer MILLIseconds — same
    longest-matching-agent group choice as :func:`robots_allows`,
    fractional seconds parsed digit-wise (the priority_milli
    discipline: '0.5'*1000 must be exactly 500, never through a
    float).  Absent/malformed -> ``default``."""
    agent = agent.lower()
    best_agent, best_len = None, -1
    for a, _, _ in rules:
        if a == "*":
            if best_agent is None:
                best_agent, best_len = "*", -1
        elif a in agent and len(a) > best_len:
            best_agent, best_len = a, len(a)
    if best_agent is None:
        return default
    for a, kind, val in rules:
        if a == best_agent and kind == "crawl-delay":
            m = _DELAY_VAL_RX.match(val)
            if m is None:
                return default
            return int(m.group(1)) * 1000 + int((m.group(2) or "")[:3].ljust(3, "0"))
    return default


def _robots_pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 path matching: literal prefix with '*' wildcards and an
    optional '$' end anchor."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(p) for p in pattern.split("*"))
    return re.match(rx + ("$" if anchored else ""), path) is not None


def robots_allows(rules: list[tuple[str, str, str]], agent: str, path: str) -> bool:
    """RFC 9309 decision: pick the group for the LONGEST matching agent
    token ('*' as fallback), then among that group's rules matching the
    path take the longest pattern — Allow wins length ties.  No group /
    no matching rule => allowed."""
    agent = agent.lower()
    best_agent, best_len = None, -1
    for a, _, _ in rules:
        if a == "*":
            if best_agent is None:
                best_agent, best_len = "*", -1
        elif a in agent and len(a) > best_len:
            best_agent, best_len = a, len(a)
    if best_agent is None:
        return True
    verdict, verdict_len, verdict_allow = True, -1, False
    for a, kind, pattern in rules:
        if a != best_agent or kind not in ("allow", "disallow"):
            continue
        if pattern == "":
            # empty Disallow = allow everything (a rule of length 0)
            continue
        if _robots_pattern_matches(pattern, path):
            is_allow = kind == "allow"
            plen = len(pattern)
            if plen > verdict_len or (plen == verdict_len and is_allow and not verdict_allow):
                verdict, verdict_len, verdict_allow = is_allow, plen, is_allow
    return verdict


def robots_filter(
    df: DataFrame,
    robots_col: str = "robots",
    path_col: str = "path",
    agent: str = "esgopeta",
    out_col: str = "allowed",
) -> DataFrame:
    """Append the RFC 9309 crawl verdict (1/0) for ``path_col`` under
    ``robots_col``'s robots.txt — the frontier politeness gate.  One
    Arrow kernel; stateless (stream-safe)."""

    @F.pandas_udf("int")
    def _allowed(robots: pd.Series, path: pd.Series) -> pd.Series:
        cache: dict[str, list] = {}

        def one(r, p):
            r = r if isinstance(r, str) else ""
            rules = cache.get(r)
            if rules is None:
                rules = cache[r] = parse_robots(r)
            return 1 if robots_allows(rules, agent, p if isinstance(p, str) else "") else 0

        return pd.Series([one(r, p) for r, p in zip(robots, path)])

    return df.withColumn(out_col, _allowed(F.col(robots_col), F.col(path_col)))


# ---------------------------------------------------------------------------
# WARC record framing (ISO 28500 — the Common Crawl container)
# ---------------------------------------------------------------------------


def build_warc_record(
    uri: str,
    payload: bytes,
    rec_type: str = "response",
    rec_id: str = "",
    concurrent_to: str = "",
) -> bytes:
    """One WARC/1.0 record: version line, named headers, CRLFCRLF,
    payload, CRLFCRLF terminator.  The encoder twin for ``parse_warc``
    (records concatenate into a .warc file).  Deterministic: no clock —
    WARC-Date must be supplied via rec_id-style fields by callers that
    need one (the fixtures pin a constant)."""
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        + (f"WARC-Record-ID: {rec_id}\r\n" if rec_id else "")
        + (f"WARC-Concurrent-To: {concurrent_to}\r\n" if concurrent_to else "")
        + f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    )
    return head.encode("utf-8") + payload + b"\r\n\r\n"


def gzip_members(blob: bytes) -> list[bytes]:
    """Split and decompress CONCATENATED gzip members — the .warc.gz
    layout (Common Crawl compresses each record as its own member so
    readers can seek by byte offset).  Truncated/garbage members raise
    ValueError (callers quarantine)."""
    import zlib as _zlib

    out: list[bytes] = []
    i, n = 0, len(blob)
    while i < n:
        d = _zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(blob[i:]))
        except _zlib.error as exc:
            raise ValueError(f"bad gzip member at offset {i}: {exc}") from exc
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {i}")
        i = n - len(d.unused_data)
    return out


def gzip_record(data: bytes) -> bytes:
    """One deterministic gzip member (mtime pinned to 0 — no clock in a
    fixture path) — the encoder twin for ``gzip_members``."""
    import gzip as _gzip

    return _gzip.compress(data, mtime=0)


def maybe_gunzip_warc(blob: bytes) -> bytes:
    """.warc.gz blobs (gzip magic) decompress to the concatenated
    records; .warc.zst blobs (zstd magic — r13, the archive format
    newer crawls ship) decode through the RFC 8878 path (multi-frame
    concatenation handled, skippable dictionary frames tolerated);
    plain .warc bytes pass through."""
    if blob[:2] == b"\x1f\x8b":
        return b"".join(gzip_members(blob))
    if blob[:4] == b"\x28\xb5\x2f\xfd" or (
        len(blob) >= 4 and blob[1:4] == b"\x2a\x4d\x18"
        and 0x50 <= blob[0] <= 0x5F
    ):
        try:
            return _pa_stream_decompress(blob, "zstd")
        except ImportError:
            from esgopeta_spark.operators.zstd import zstd_decompress

            return zstd_decompress(blob)
    return blob


def parse_warc(blob: bytes) -> list[dict]:
    """Parse concatenated WARC/1.0 records: returns one dict per record
    with ``type``, ``uri``, ``length`` (declared Content-Length),
    ``payload`` (exactly that many bytes — binary-safe: payload bytes
    are never scanned for markers, the declared length frames them, per
    ISO 28500), plus ``offset``/``reclen`` (the record's byte position
    and total framed size — the CDX index fields).  Malformed framing
    raises ValueError (callers quarantine)."""
    out: list[dict] = []
    i, n = 0, len(blob)
    while i < n:
        if blob[i : i + 2] == b"\r\n":  # tolerate extra blank lines
            i += 2
            continue
        if not blob.startswith(b"WARC/", i):
            raise ValueError(f"not a WARC record at offset {i}")
        hdr_end = blob.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header")
        lines = blob[i:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/1."):
            raise ValueError(f"unsupported WARC version {lines[0]!r}")
        hdrs = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line {ln!r}")
            hdrs[k.strip().lower()] = v.strip()
        try:
            length = int(hdrs["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/bad Content-Length") from exc
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError("truncated WARC payload")
        payload = blob[body_start : body_start + length]
        if blob[body_start + length : body_start + length + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record terminator")
        rec_start = i
        i = body_start + length + 4
        out.append(
            {
                "type": hdrs.get("warc-type", ""),
                "uri": hdrs.get("warc-target-uri", ""),
                "length": length,
                "payload": payload,
                "offset": rec_start,
                "reclen": i - rec_start,
                # record linkage (ISO 28500 §5.4/§5.7): how a response
                # finds the request that produced it
                "rec_id": hdrs.get("warc-record-id", ""),
                "concurrent_to": hdrs.get("warc-concurrent-to", ""),
            }
        )
    return out


def parse_http_response(payload: bytes) -> tuple[int, dict, bytes]:
    """A WARC ``response`` record's payload is a FULL HTTP message
    (status line + headers + body), not a bare document — split it:
    returns (status, lowercased-header dict, body bytes).  Tolerates
    bare-LF header endings (seen in old crawls).  A payload that does
    not start with ``HTTP/`` is returned as (0, {}, payload) — some
    archives store bare bodies; total, never raises on that path.
    Chunked transfer-encoding is de-chunked (archives usually store it
    verbatim); a malformed chunk framing raises ValueError (callers
    quarantine)."""
    if not payload.startswith(b"HTTP/"):
        return 0, {}, payload
    sep, hlen = b"\r\n\r\n", 4
    end = payload.find(sep)
    lf_end = payload.find(b"\n\n")
    if end < 0 or (0 <= lf_end < end):
        sep, hlen, end = b"\n\n", 2, lf_end
    if end < 0:
        return 0, {}, payload  # header never ends: treat as bare bytes
    head = payload[:end].decode("latin-1")
    lines = head.replace("\r\n", "\n").split("\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return 0, {}, payload
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, s, v = ln.partition(":")
        if s:
            headers[k.strip().lower()] = v.strip()
    body = payload[end + hlen :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        out, i, n = [], 0, len(body)
        while True:
            eol = body.find(b"\r\n", i)
            if eol < 0:
                raise ValueError("bad chunk size line")
            try:
                size = int(body[i:eol].split(b";")[0], 16)
            except ValueError as exc:
                raise ValueError("bad chunk size") from exc
            i = eol + 2
            if size == 0:
                break
            if i + size > n:
                raise ValueError("truncated chunk")
            out.append(body[i : i + size])
            i += size + 2  # skip the chunk's trailing CRLF
        body = b"".join(out)
    enc = headers.get("content-encoding", "").lower()
    if enc:
        body = decode_content_encoding(enc, body)
    return status, headers, body


def _pa_stream_decompress(body: bytes, codec: str) -> bytes:
    """Streaming decompress via pyarrow's bundled C codecs (present in
    every pyspark container) — the scale tier for br/zstd bodies whose
    decompressed size the HTTP message does not declare."""
    import pyarrow as _pa

    try:
        with _pa.input_stream(_pa.BufferReader(body), compression=codec) as s:
            return s.read()
    except (OSError, _pa.ArrowInvalid) as exc:
        raise ValueError(f"bad {codec} body: {exc}") from exc


def decode_content_encoding(enc: str, body: bytes) -> bytes:
    """HTTP ``Content-Encoding`` unwrap (RFC 9110 §8.4.1) — the layer
    between de-chunking and charset decode that ~half of real crawl
    responses carry: ``gzip``/``x-gzip`` (RFC 1952), ``deflate`` (the
    RFC 1950 zlib wrapper the spec means, with the raw-RFC-1951
    fallback misconfigured servers actually send — a well-known interop
    bug every browser tolerates), ``zstd`` (RFC 8878 — r13: the
    from-scratch decoder in operators/zstd.py, conformance-validated
    against libzstd, with pyarrow's C decoder preferred when importable
    — byte-equality of the two paths pinned in tests), ``br`` (RFC
    7932 via pyarrow's bundled brotli — a from-scratch brotli is out of
    honest scope: its 120 KB static dictionary cannot be retyped
    verifiably, the B.7 lesson), ``identity``/empty pass-through.  A
    comma list applies codings right-to-left (the header names them in
    the order APPLIED, so the last-listed coding is the outermost).
    Unknown codings, br without pyarrow, and corrupt streams raise
    ValueError: at 100 TB an undecodable body must quarantine to its
    own visible error row, never pass garbage bytes downstream as if
    they were the document."""
    import zlib as _zlib

    for coding in reversed([c.strip() for c in enc.split(",")]):
        if coding in ("", "identity"):
            continue
        if coding in ("gzip", "x-gzip"):
            try:
                body = _zlib.decompress(body, wbits=31)
            except _zlib.error as exc:
                raise ValueError(f"bad gzip body: {exc}") from exc
        elif coding == "deflate":
            try:
                body = _zlib.decompress(body)  # zlib-wrapped (the RFC meaning)
            except _zlib.error:
                try:
                    body = _zlib.decompress(body, wbits=-15)  # raw: server bug
                except _zlib.error as exc:
                    raise ValueError(f"bad deflate body: {exc}") from exc
        elif coding == "zstd":
            try:
                body = _pa_stream_decompress(body, "zstd")
            except ImportError:
                from esgopeta_spark.operators.zstd import zstd_decompress

                body = zstd_decompress(body)
        elif coding == "br":
            try:
                body = _pa_stream_decompress(body, "brotli")
            except ImportError as exc:
                raise ValueError(
                    "brotli body with no decoder available"
                ) from exc
        else:
            raise ValueError(f"unsupported content-encoding {coding!r}")
    return body


def encode_content_body(coding: str, data: bytes) -> bytes:
    """Encoder twin for :func:`decode_content_encoding` — deterministic
    (no clock, fixed level): ``gzip`` via the mtime-0 member builder,
    ``deflate`` the zlib wrapper, ``deflate-raw`` the headerless
    RFC 1951 stream real misconfigured servers emit (its header still
    says ``deflate``), ``identity`` pass-through."""
    import zlib as _zlib

    if coding == "gzip":
        return gzip_record(data)
    if coding == "deflate":
        return _zlib.compress(data)
    if coding == "deflate-raw":
        c = _zlib.compressobj(wbits=-15)
        return c.compress(data) + c.flush()
    if coding in ("zstd", "br"):
        # r13: modern codings via pyarrow's bundled C encoders (fixed
        # level -> deterministic within a container; the compressed
        # bytes never cross the oracle boundary — only the recovered
        # page does)
        import pyarrow as _pa

        return _pa.Codec(
            "brotli" if coding == "br" else "zstd", compression_level=3
        ).compress(data, asbytes=True)
    if coding == "identity":
        return data
    raise ValueError(f"unknown fixture coding {coding!r}")


def _chunk_body(data: bytes, size: int = 1024) -> bytes:
    """Chunked transfer framing for fixtures: hex size line, chunk,
    CRLF, terminated by the zero chunk."""
    out = []
    for i in range(0, len(data), size):
        part = data[i : i + size]
        out.append(f"{len(part):x}".encode() + b"\r\n" + part + b"\r\n")
    out.append(b"0\r\n\r\n")
    return b"".join(out)


# fixture row classes for the content-encoding entry: header value,
# body coding actually applied, chunked framing — class 2 is the
# raw-deflate server bug (header still says deflate), class 3 layers
# chunked transfer framing OVER a gzip body (the real wire shape:
# Transfer-Encoding applies outside Content-Encoding)
_ENC_CLASSES = [
    ("gzip", "gzip", False),
    ("deflate", "deflate", False),
    ("deflate", "deflate-raw", False),
    ("gzip", "gzip", True),
]
# r13: the modern codings (RFC 8878 zstd through the from-scratch/
# pyarrow decoders, RFC 7932 brotli via pyarrow) — plain and
# chunk-framed forms of each
_ENC_CLASSES_MODERN = [
    ("zstd", "zstd", False),
    ("br", "br", False),
    ("zstd", "zstd", True),
    ("br", "br", True),
]


def synth_encoded_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    uri_col: str = "uri",
    page_col: str = "page",
    out_col: str = "warc",
    classes: list | None = None,
) -> DataFrame:
    """Encoder-twin fixture for the Content-Encoding entries: per doc,
    frame the page's UTF-8 bytes as a FULL HTTP/1.1 200 message whose
    body is compressed per the doc's ``classes[doc_id % len(classes)]``
    row class (default ``_ENC_CLASSES``; and chunk-framed where the
    class says so), inside one WARC/1.0 response record.  Every byte
    downstream of the page string is produced by the twin encoders the
    decoder must invert."""
    enc_classes = list(classes) if classes is not None else _ENC_CLASSES

    @F.pandas_udf("binary")
    def _build(did: pd.Series, uri: pd.Series, page: pd.Series) -> pd.Series:
        def one(d, u, p):
            hdr_enc, coding, chunked = enc_classes[int(d) % len(enc_classes)]
            body = encode_content_body(
                coding, (p if isinstance(p, str) else "").encode("utf-8")
            )
            head = [
                "HTTP/1.1 200 OK",
                "Content-Type: text/html; charset=utf-8",
                f"Content-Encoding: {hdr_enc}",
            ]
            if chunked:
                head.append("Transfer-Encoding: chunked")
                body = _chunk_body(body, 777)
            else:
                head.append(f"Content-Length: {len(body)}")
            payload = ("\r\n".join(head) + "\r\n\r\n").encode("latin-1") + body
            return build_warc_record(u if isinstance(u, str) else "", payload)

        return pd.Series(
            [one(d, u, p) for d, u, p in zip(did, uri, page)]
        )

    return df.withColumn(
        out_col, _build(F.col(id_col), F.col(uri_col), F.col(page_col))
    )


def http_unwrap_digest(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """WARC blob -> (status, content_encoding header, de-chunked +
    content-decoded + charset-decoded page digest) per record — the
    observable proof the HTTP unwrap layer inverted the wire encodings
    exactly: ``page_md5``/``n_chars`` are over the RECOVERED page
    string, so one wrong byte anywhere in gunzip/inflate/de-chunk/
    charset mismatches the closed-form oracle.  Poison records
    quarantine to a visible error row.  One Arrow kernel, shuffle-free;
    stateless (stream-safe)."""

    @F.pandas_udf(
        "array<struct<uri: string, status: int, content_encoding: string,"
        " page_md5: string, n_chars: bigint>>"
    )
    def _digest(s: pd.Series) -> pd.Series:
        import hashlib

        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError as exc:
                return [{"uri": str(exc)[:80], "status": -1,
                         "content_encoding": "error", "page_md5": "",
                         "n_chars": -1}]
            out = []
            for r in recs:
                try:
                    status, hdrs, body = parse_http_response(r["payload"])
                    page = decode_html_bytes(body, hdrs)
                    out.append({
                        "uri": r["uri"], "status": status,
                        "content_encoding": hdrs.get("content-encoding",
                                                     "identity"),
                        "page_md5": hashlib.md5(
                            page.encode("utf-8")).hexdigest(),
                        "n_chars": len(page),
                    })
                except ValueError:
                    out.append({"uri": r["uri"], "status": -1,
                                "content_encoding": "error",
                                "page_md5": "", "n_chars": -1})
            return out

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_digest(F.col(blob_col))).alias("r"))
        .select(id_col, "r.uri", "r.status", "r.content_encoding",
                "r.page_md5", "r.n_chars")
    )


def warc_build(
    df: DataFrame,
    uri_col: str = "uri",
    text_col: str = "html",
    out_col: str = "warc",
) -> DataFrame:
    """Append a single-record WARC blob framing ``text_col``'s UTF-8
    bytes as a response for ``uri_col`` — the encoder-twin Arrow kernel
    for ``warc_extract``."""

    @F.pandas_udf("binary")
    def _build(uri: pd.Series, txt: pd.Series) -> pd.Series:
        return pd.Series(
            [
                build_warc_record(
                    u if isinstance(u, str) else "",
                    (t if isinstance(t, str) else "").encode("utf-8"),
                )
                for u, t in zip(uri, txt)
            ]
        )

    return df.withColumn(out_col, _build(F.col(uri_col), F.col(text_col)))


def warc_extract(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """(id, warc-bytes) -> one row per record: (id, rec_type, uri,
    content_length, payload_md5) via an Arrow kernel; malformed blobs
    quarantine to a single (id, 'error', <msg>, -1, '') row — a poison
    record costs itself, not the stage."""
    import hashlib

    @F.pandas_udf("array<struct<rec_type: string, uri: string, content_length: bigint, payload_md5: string>>")
    def _parse(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError as exc:
                return [{"rec_type": "error", "uri": str(exc)[:80],
                         "content_length": -1, "payload_md5": ""}]
            return [
                {
                    "rec_type": r["type"],
                    "uri": r["uri"],
                    "content_length": r["length"],
                    "payload_md5": hashlib.md5(r["payload"]).hexdigest(),
                }
                for r in recs
            ]

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_parse(F.col(blob_col))).alias("r"))
        .select(id_col, "r.rec_type", "r.uri", "r.content_length", "r.payload_md5")
    )


def sniff_payload(b: bytes) -> str:
    """Content-type sniff for crawl payloads: the media magic table
    (operators/codecs.sniff_format) first, then a markup check — a
    crawler cannot trust Content-Type headers, it routes on bytes."""
    from esgopeta_spark.operators import codecs

    kind = codecs.sniff_format(b)
    if kind in ("unknown", "empty"):
        head = bytes(b[:256])
        # BOM-aware markup check (HTML5 prescan): a utf-8 BOM hides the
        # '<' from a prefix test, and utf-16 interleaves NULs into it
        if head[:3] == b"\xef\xbb\xbf":
            head = head[3:]
        elif head[:2] in (b"\xff\xfe", b"\xfe\xff"):
            try:
                head = head.decode("utf-16", "ignore").encode("utf-8", "replace")
            except ValueError:
                pass
        head = head.lstrip().lower()
        if head.startswith((b"<!doctype", b"<html", b"<head", b"<body", b"<?xml")):
            return "html"
    return kind


def warc_route(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """Parse WARC records, unwrap the HTTP message a ``response``
    payload really is (status line + headers + body, de-chunked —
    Common Crawl stores the full message), sniff the BODY's real type,
    and run the matching decoder — the crawl-side fan-in to the media
    codec stack: html -> extract_html_text (stat = clean-text chars),
    png/bmp/ppm/gif/tiff/jpeg -> image decode (stat = width*height),
    wav/flac -> audio decode (stat = n_samples); anything else passes
    through with stat = -1.  ``status`` is the HTTP status (0 for a
    bare-body record).  Poison payloads quarantine per-record ('error'
    kind), never the stage.  One Arrow kernel per partition batch,
    shuffle-free."""
    from esgopeta_spark.operators import codecs
    from esgopeta_spark.operators.pdf import extract_pdf_text

    @F.pandas_udf(
        "array<struct<uri: string, kind: string, status: int, stat: bigint>>"
    )
    def _route(s: pd.Series) -> pd.Series:
        image = {"png": codecs.decode_png, "bmp": codecs.decode_bmp,
                 "ppm": codecs.decode_ppm, "gif": codecs.decode_gif,
                 "tiff": codecs.decode_tiff, "jpeg": codecs.decode_jpeg}

        def one_record(r):
            try:
                status, hdrs, body = parse_http_response(r["payload"])
                kind = sniff_payload(body)
                if kind == "html":
                    text = decode_html_bytes(body, hdrs)
                    stat = len(extract_html_text(text))
                elif kind == "pdf":
                    stat = len(extract_pdf_text(body))
                elif kind in image:
                    arr = image[kind](body)
                    stat = int(arr.shape[0]) * int(arr.shape[1])
                elif kind == "wav":
                    samples, _sr, _ch = codecs.decode_wav(body)
                    stat = int(samples.shape[0])
                elif kind == "flac":
                    samples, _sr, _ch = codecs.decode_flac(body)
                    stat = int(samples.shape[0])
                else:
                    stat = -1
                return {"uri": r["uri"], "kind": kind, "status": status, "stat": stat}
            except ValueError:
                return {"uri": r["uri"], "kind": "error", "status": -1, "stat": -1}

        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError as exc:
                return [{"uri": str(exc)[:80], "kind": "error",
                         "status": -1, "stat": -1}]
            return [one_record(r) for r in recs]

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_route(F.col(blob_col))).alias("r"))
        .select(id_col, "r.uri", "r.kind", "r.status", "r.stat")
    )


def warc_html_text(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """WARC blobs -> one row per record whose (HTTP-unwrapped) payload
    sniffs as html: (id, uri, clean_text) — the ingest head of the full
    crawl-to-shards pipeline.  Non-html records and poison payloads are
    simply dropped (the route/extract entries report them; the corpus
    pipeline wants the text).  One Arrow kernel; gz-transparent."""

    @F.pandas_udf("array<struct<uri: string, clean_text: string>>")
    def _text(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError:
                return []
            out = []
            for r in recs:
                try:
                    _st, hdrs, body = parse_http_response(r["payload"])
                    if sniff_payload(body) != "html":
                        continue
                    text = decode_html_bytes(body, hdrs)
                    out.append({"uri": r["uri"], "clean_text": extract_html_text(text)})
                except ValueError:
                    continue
            return out

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_text(F.col(blob_col))).alias("r"))
        .select(id_col, "r.uri", "r.clean_text")
    )


def warc_doc_text(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """WARC blobs -> one row per record whose (HTTP-unwrapped) payload
    sniffs as a TEXT DOCUMENT — html via the extraction kernel OR
    (r11) pdf via the from-scratch bounded PDF parser: (id, uri, kind,
    clean_text).  The html+pdf superset of :func:`warc_html_text` — a
    real pretraining corpus ingests both (C4/CCNet lineage is html;
    science/books-heavy mixes lean on pdf).  Non-document records and
    poison payloads drop (route/extract entries report them; the
    corpus pipeline wants the text).  One Arrow kernel; gz-transparent;
    stateless (stream-safe)."""
    from esgopeta_spark.operators.pdf import extract_pdf_text

    @F.pandas_udf("array<struct<uri: string, kind: string, clean_text: string>>")
    def _text(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError:
                return []
            out = []
            for r in recs:
                try:
                    _st, hdrs, body = parse_http_response(r["payload"])
                    kind = sniff_payload(body)
                    if kind == "html":
                        text = extract_html_text(decode_html_bytes(body, hdrs))
                    elif kind == "pdf":
                        text = extract_pdf_text(body)
                    else:
                        continue
                    out.append({"uri": r["uri"], "kind": kind, "clean_text": text})
                except ValueError:
                    continue
            return out

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_text(F.col(blob_col))).alias("r"))
        .select(id_col, "r.uri", "r.kind", "r.clean_text")
    )


def host_template_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    min_frac_milli: int = 500,
    min_docs: int = 3,
) -> DataFrame:
    """Host-level TEMPLATE line removal (the CCNet-lineage boilerplate
    cut that per-page extraction can't make): a line appearing in at
    least ``min_frac_milli``/1000 of a host's documents (and in at
    least ``min_docs`` of them — small hosts carry no evidence) is
    site furniture (copyright banners, nav crumbs, cookie notices),
    not content, and is removed from every page of that host.  Counts
    are per-DOCUMENT (a line repeated within one page is one vote) and
    the threshold is integer milli arithmetic — no float boundary can
    disagree with the oracle.  All codegen, no Python: posexplode ->
    one (host, line)-keyed aggregate -> broadcast the (small)
    boilerplate set back -> one doc-keyed regroup that reassembles the
    cleaned text in line order.  Exactly two shuffles, both on the
    keys a 100 TB corpus partitions by anyway (host, doc); the
    template set per host is bounded by template size, so the
    broadcast holds at any corpus scale."""
    lines = df.select(
        F.col(id_col), F.col(host_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    host_docs = df.groupBy(host_col).agg(F.count("*").alias("host_docs"))
    line_docs = lines.groupBy(host_col, "line").agg(
        F.countDistinct(id_col).alias("line_docs")
    )
    bp = (
        line_docs.join(F.broadcast(host_docs), host_col)
        .where(
            (F.col("line_docs") >= F.lit(min_docs))
            & (F.col("line_docs") * 1000 >= F.lit(min_frac_milli) * F.col("host_docs"))
        )
        .select(host_col, "line", F.lit(1).alias("is_bp"))
    )
    flagged = lines.join(F.broadcast(bp), [host_col, "line"], "left")
    kept = F.when(F.col("is_bp").isNull(), F.struct("pos", "line"))
    return (
        flagged.groupBy(id_col, host_col)
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.coalesce(F.col("is_bp"), F.lit(0))).cast("bigint")
            .alias("n_dropped"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda x: x["line"]
                ),
            ).alias("clean_text"),
        )
    )


def surt_key(url: str) -> str:
    """Sort-friendly URI Reordering Transform of the CANONICAL url —
    the Common Crawl CDX index key: host labels reversed and
    comma-joined, then ')' + path[?query] (scheme dropped; the
    canonicalizer already lowercased and stripped ports/fragments/
    tracking params).  Unparseable strings return canonical-as-is."""
    c = canonicalize_url(url)
    m = _URL_RE.match(c)
    if m is None:
        return c
    _scheme, hostport, path, query = m.groups()
    host = hostport.partition(":")[0]
    key = ",".join(reversed(host.split("."))) + ")" + (path or "/")
    if query:
        key += "?" + query
    return key


def charset_of(headers: dict, default: str = "utf-8") -> str:
    """charset= parameter of a Content-Type header (lowercased), or the
    default; unknown names fall back at decode time."""
    m = re.search(r"charset=([\w.:-]+)", headers.get("content-type", ""), re.I)
    return m.group(1).lower() if m else default


#: WHATWG-style label normalization for the sniffed subset this module
#: handles: the latin-1 family IS windows-1252 on the real web (the
#: HTML5 rule), and a meta can never declare utf-16 (the prescan that
#: would read it is ASCII-based), so those labels mean utf-8.
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "latin-1": "windows-1252", "latin1": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "cp1252": "windows-1252",
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}


_HTML_COMMENT_RX = re.compile(rb"<!--.*?(?:-->|$)", re.S)
_META_TAG_RX = re.compile(rb"<meta\b([^>]{0,500})", re.I)
_META_ATTR_RX = re.compile(
    rb"""([A-Za-z][\w-]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|([^\s"'>]*)))?"""
)
_CONTENT_CHARSET_RX = re.compile(rb"""charset\s*=\s*["']?([\w.:-]+)""", re.I)


def _prescan_meta_charset(b: bytes) -> bytes | None:
    """WHATWG-prescan-shaped <meta> charset extraction: comment spans
    are skipped, each <meta> tag's ATTRIBUTES are parsed (first
    occurrence wins, per spec), and only a real ``charset`` attribute —
    or a ``charset=`` inside the ``content`` value of an
    http-equiv=content-type tag — declares the encoding.  A stray
    'charset=' in some other attribute value (<meta name=x content=
    "see charset=shift_jis docs">) no longer counts."""
    b = _HTML_COMMENT_RX.sub(b"", b)
    for m in _META_TAG_RX.finditer(b):
        attrs: dict[bytes, bytes] = {}
        for am in _META_ATTR_RX.finditer(m.group(1)):
            name = am.group(1).lower()
            if not name or name in attrs:
                continue
            if am.group(3) is not None:
                val = am.group(3)
            elif am.group(4) is not None:
                val = am.group(4)
            else:
                val = am.group(5) or b""
            attrs[name] = val
        if attrs.get(b"charset"):
            return attrs[b"charset"]
        if attrs.get(b"http-equiv", b"").strip().lower() == b"content-type":
            cm = _CONTENT_CHARSET_RX.search(attrs.get(b"content", b""))
            if cm:
                return cm.group(1)
    return None


def sniff_charset(body: bytes, headers: dict | None = None) -> str:
    """HTML5-style charset determination for a crawl payload, in
    precedence order: BOM (utf-8 / either utf-16, stripped by the
    returned codec) > Content-Type header charset > <meta charset> /
    http-equiv prescan over the first 1024 bytes (attribute-aware:
    comments skipped, only a charset ATTRIBUTE or the content value of
    an http-equiv=content-type meta counts) > utf-8 default.  Labels
    normalized via the WHATWG-style alias map."""
    b = bytes(body[:1024])
    if b[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if b[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    if headers:
        m = re.search(r"charset=([\w.:-]+)", headers.get("content-type", ""), re.I)
        if m:
            lab = m.group(1).lower()
            return _CHARSET_ALIASES.get(lab, lab)
    raw = _prescan_meta_charset(b)
    if raw:
        lab = raw.decode("ascii", "replace").lower()
        return _CHARSET_ALIASES.get(lab, lab)
    return "utf-8"


def decode_html_bytes(body: bytes, headers: dict | None = None) -> str:
    """Decode crawl html bytes by the sniffed charset; an unknown label
    falls back to utf-8.  Total."""
    enc = sniff_charset(body, headers)
    try:
        return bytes(body).decode(enc, "replace")
    except LookupError:
        return bytes(body).decode("utf-8", "replace")


def cdx_index(
    df: DataFrame,
    blob_col: str = "warc",
    group_col: str = "grp",
) -> DataFrame:
    """Multi-record WARC blobs -> CDX-style index rows: one row per
    record with (grp, urlkey = SURT of the record URI, uri, offset,
    reclen) — the seekable-archive index Common Crawl publishes next to
    every .warc.gz.  Transparent for gzipped blobs (offsets then index
    the DECOMPRESSED stream).  One Arrow kernel, shuffle-free."""

    @F.pandas_udf(
        "array<struct<urlkey: string, uri: string, offset: bigint, reclen: bigint>>"
    )
    def _index(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError as exc:
                return [{"urlkey": "error", "uri": str(exc)[:80],
                         "offset": -1, "reclen": -1}]
            return [
                {"urlkey": surt_key(r["uri"]), "uri": r["uri"],
                 "offset": r["offset"], "reclen": r["reclen"]}
                for r in recs
            ]

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(group_col), F.explode(_index(F.col(blob_col))).alias("r"))
        .select(group_col, "r.urlkey", "r.uri", "r.offset", "r.reclen")
    )


def synth_mixed_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    uri_col: str = "uri",
    out_col: str = "warc",
    text_col: str = "text",
) -> DataFrame:
    """Fixture twin for ``warc_route``: per row, frame ONE payload by
    id mod 4 — the html string's UTF-8 bytes (every EIGHTH doc wrapped
    in a full HTTP/1.1 200 message, the shape Common Crawl actually
    stores), a deterministic gray PNG (w = 3 + id%5, h = 2 + id%7,
    pixel = (x+y+id) mod 256), a deterministic WAV tone
    (500 + (id%11)*16 samples), or (r11) the two-page fixture PDF built
    from the html column's EMBEDDED corpus text — as a WARC response
    record, so the route stats have closed forms.  The pdf branch takes
    a separate ``text_col`` (raw corpus text; pdf strings are verbatim,
    not html-escaped)."""
    import numpy as np

    from esgopeta_spark.operators import codecs
    from esgopeta_spark.operators.pdf import build_pdf

    @F.pandas_udf("binary")
    def _build(did: pd.Series, html: pd.Series, uri: pd.Series,
               txt: pd.Series) -> pd.Series:
        out = []
        for i, h, u, t in zip(did, html, uri, txt):
            i = int(i)
            k = i % 4
            if k == 0:
                payload = (h if isinstance(h, str) else "").encode("utf-8")
                if i % 8 == 0:
                    payload = (
                        b"HTTP/1.1 200 OK\r\n"
                        b"Content-Type: text/html; charset=utf-8\r\n"
                        b"Server: fixture\r\n\r\n"
                    ) + payload
            elif k == 1:
                w, ht = 3 + i % 5, 2 + i % 7
                y, x = np.mgrid[0:ht, 0:w]
                payload = codecs.encode_png(((x + y + i) % 256).astype(np.uint8))
            elif k == 2:
                n = 500 + (i % 11) * 16
                tt = np.arange(n)
                payload = codecs.encode_wav(
                    (1000 * np.sin(tt * 0.05 + i)).astype(np.int16), 8000
                )
            else:
                payload = build_pdf(i, t if isinstance(t, str) else "")
            out.append(build_warc_record(u if isinstance(u, str) else "", payload))
        return pd.Series(out)

    return df.withColumn(
        out_col,
        _build(F.col(id_col), F.col(html_col), F.col(uri_col),
               F.col(text_col)),
    )


def synth_url_variants(doc_id_col: F.Column) -> F.Column:
    """Five syntactic variants of one canonical resource per doc, pure
    codegen — uppercase scheme/host + default port + fragment, tracking
    params, percent-encoded unreserved char, param reorder + empty
    segment.  ``canonicalize_url`` must map ALL of them to the seed the
    oracle recomputes in closed form."""
    sid = (doc_id_col % F.lit(40)).cast("string")
    did = doc_id_col.cast("string")
    pg = (doc_id_col % F.lit(7)).cast("string")
    seed_tail = F.concat(F.lit(".example.com/articles/"), did,
                         F.lit("?page="), pg)
    return F.array(
        F.concat(F.lit("https://site"), sid, seed_tail),
        F.concat(F.lit("HTTPS://SITE"), sid, F.lit(".EXAMPLE.COM:443/articles/"),
                 did, F.lit("?page="), pg, F.lit("#ref")),
        F.concat(F.lit("https://site"), sid, seed_tail,
                 F.lit("&utm_source=feed&utm_medium=rss&fbclid=abc123")),
        F.concat(F.lit("https://site"), sid, F.lit(".example.com/%61rticles/"),
                 did, F.lit("?page="), pg),
        F.concat(F.lit("https://site"), sid, F.lit(".example.com/articles/"),
                 did, F.lit("?utm_campaign=x&page="), pg, F.lit("&")),
    )


def url_features(df: DataFrame, url_col: str = "url_canon") -> DataFrame:
    """Append the URL-shape quality features RefinedWeb/fineweb-style
    curation filters on (Penedo et al. 2023 §3.1 use URL blocklists and
    shape heuristics before any content model): path depth (segments),
    path/query lengths, digit count in the path (session-id / paginated
    sludge), query-param count, and a hyphen count (keyword-stuffed
    slugs) — ALL pure codegen over the canonical url, no kernel.  The
    gate itself stays the caller's policy; these are the signals."""
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+([^?#]*)", 1)
    query = F.regexp_extract(F.col(url_col), r"\?(.*)$", 1)
    return (
        df.withColumn("path_len", F.length(path).cast("int"))
        .withColumn(
            "path_depth",
            F.when(path == "/", F.lit(0))
            .otherwise(F.size(F.split(path, "/", -1)) - 1)
            .cast("int"),
        )
        .withColumn(
            "path_digits",
            (F.length(path) - F.length(F.regexp_replace(path, r"[0-9]", ""))).cast("int"),
        )
        .withColumn(
            "path_hyphens",
            (F.length(path) - F.length(F.regexp_replace(path, r"-", ""))).cast("int"),
        )
        .withColumn("query_len", F.length(query).cast("int"))
        .withColumn(
            "n_params",
            F.when(query == "", F.lit(0))
            .otherwise(F.size(F.split(query, "&", -1)))
            .cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# HTTP redirects (r11, verdict #4): real WARCs are ~20-30% redirects;
# URL-level dedup and frontier scheduling must collapse the chains
# ---------------------------------------------------------------------------


def warc_redirect_edges(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """WARC blobs -> one row per 3xx response record carrying a
    ``Location`` header: (id, src_url, dst_url, status) with src = the
    canonicalized record URI and dst = Location RESOLVED against the
    record URI (RFC 3986 §5.2 — Location is legally relative) then
    canonicalized.  Non-redirect records and poison payloads drop (the
    route entry reports them).  One Arrow kernel; gz-transparent;
    stateless (stream-safe)."""

    @F.pandas_udf("array<struct<src: string, dst: string, status: int>>")
    def _edges(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError:
                return []
            out = []
            for r in recs:
                try:
                    status, hdrs, _body = parse_http_response(r["payload"])
                    if not 300 <= status < 400:
                        continue
                    loc = hdrs.get("location", "")
                    if not loc:
                        continue
                    out.append(
                        {
                            "src": canonicalize_url(r["uri"]),
                            "dst": canonicalize_url(resolve_url(r["uri"], loc)),
                            "status": status,
                        }
                    )
                except ValueError:
                    continue
            return out

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_edges(F.col(blob_col))).alias("r"))
        .select(id_col, F.col("r.src").alias("src_url"),
                F.col("r.dst").alias("dst_url"), F.col("r.status").alias("status"))
    )


def collapse_redirects(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 8,
) -> DataFrame:
    """(src, dst) redirect edges -> (src, final_url, hops, resolved):
    every src mapped to its chain's final NON-REDIRECTING target.
    Chains longer than ``max_hops`` and cycles emit a VISIBLE marker
    row (final_url = '', hops = -1, resolved = 0) — never a silent
    drop (the streaming-dedup marker discipline).

    Pointer doubling: ceil(log2(max_hops)) self-joins — each round
    composes the map with itself, so an 8-hop chain resolves in 3
    rounds, not 8.  Every join is url-EQUI on the canonical key (the
    partitioning a 100 TB redirect table would already have); the map
    is localCheckpointed per round (iterative-loop rule: without the
    cut Catalyst re-analyzes a doubling plan tree).  Duplicate edges
    for one src (revisits) resolve deterministically to min(dst)."""
    m = (
        edges.groupBy(F.col(src_col).alias("src"))
        .agg(F.min(dst_col).alias("cur"))
        .withColumn("hops", F.lit(1).cast("bigint"))
        .localCheckpoint()
    )
    rounds = max(1, (int(max_hops) - 1).bit_length())  # ceil(log2(max_hops))
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("_s"), F.col("cur").alias("_c"),
            F.col("hops").alias("_h"),
        )
        m = (
            m.join(nxt, m["cur"] == nxt["_s"], "left")
            .select(
                "src",
                F.coalesce("_c", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("_h", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )
    # a cur that is still somebody's src did not terminate within
    # 2^rounds hops: cycle or over-cap chain -> marker
    srcs = m.select(F.col("src").alias("_src")).withColumn("_open", F.lit(1))
    out = m.join(srcs, m["cur"] == srcs["_src"], "left")
    resolved = (F.col("_open").isNull() & (F.col("hops") <= int(max_hops))).cast("int")
    return out.select(
        F.col("src").alias(src_col),
        F.when(resolved == 1, F.col("cur")).otherwise(F.lit("")).alias("final_url"),
        F.when(resolved == 1, F.col("hops")).otherwise(F.lit(-1)).cast("bigint").alias("hops"),
        resolved.alias("resolved"),
    )


def synth_redirect_warc(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "warc"
) -> DataFrame:
    """Encoder twin for the redirect chain: per doc, one WARC blob
    holding a 301 chain r0 -> r1 -> ... -> r{L-1} -> final of length
    L = 1 + id%4 (Location alternates absolute-uppercase-host /
    absolute-path / relative forms, so resolve+canonicalize do real
    work), plus — for id%5==0 — a two-record cycle c0 <-> c1 (the
    marker-row class).  Closed forms: src k resolves to .../final in
    L-k hops; cycle rows are unresolved markers."""

    @F.pandas_udf("binary")
    def _build(did: pd.Series) -> pd.Series:
        out = []
        for i in did:
            i = int(i)
            host = f"site{i % 40}.example.com"
            base = f"https://{host}/r/{i}/"
            L = 1 + i % 4
            recs = []
            for k in range(L):
                nxt = f"{k + 1}" if k + 1 < L else "final"
                # alternate Location forms: absolute w/ uppercase host +
                # default port, absolute-path, bare relative
                if k % 3 == 0:
                    loc = f"HTTPS://{host.upper()}:443/r/{i}/{nxt}"
                elif k % 3 == 1:
                    loc = f"/r/{i}/{nxt}"
                else:
                    loc = nxt  # relative to the base directory
                payload = (
                    f"HTTP/1.1 301 Moved Permanently\r\n"
                    f"Location: {loc}\r\n"
                    f"Server: fixture\r\n\r\n"
                ).encode("ascii")
                recs.append(build_warc_record(base + str(k), payload))
            if i % 5 == 0:
                for a, b in ((0, 1), (1, 0)):
                    payload = (
                        f"HTTP/1.1 302 Found\r\nLocation: /r/{i}/c{b}\r\n\r\n"
                    ).encode("ascii")
                    recs.append(build_warc_record(base + f"c{a}", payload))
            out.append(b"".join(recs))
        return pd.Series(out)

    return df.withColumn(out_col, _build(F.col(id_col)))


def robots_sitemap_seeds(
    df: DataFrame, robots_col: str = "robots", out_col: str = "url"
) -> DataFrame:
    """One row per ``Sitemap:`` directive across the robots column —
    the discovery loop's seed projection (feed it to
    ``expand_sitemap_frontier``).  One stateless Arrow kernel +
    explode."""

    @F.pandas_udf("array<string>")
    def _maps(robots: pd.Series) -> pd.Series:
        return robots.map(robots_sitemaps)

    return df.select(F.explode(_maps(F.col(robots_col))).alias(out_col))


def robots_delay(
    df: DataFrame,
    robots_col: str = "robots",
    agent: str = "esgopeta",
    out_col: str = "delay_milli",
    default: int = 0,
) -> DataFrame:
    """Append the agent's Crawl-delay (integer milliseconds, digit-wise
    parse) from ``robots_col`` — the per-host politeness spacing the
    scheduler multiplies fetch waves by.  One Arrow kernel with a
    per-batch parsed-rules cache (robots files repeat per host);
    stateless (stream-safe)."""

    @F.pandas_udf("bigint")
    def _delay(robots: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(r):
            r = r if isinstance(r, str) else ""
            v = cache.get(r)
            if v is None:
                v = cache[r] = crawl_delay_milli(parse_robots(r), agent, default)
            return v

        return pd.Series([one(r) for r in robots])

    return df.withColumn(out_col, _delay(F.col(robots_col)))


# ---------------------------------------------------------------------------
# HTTP revalidation (conditional GET planning — the recrawl loop's
# bandwidth saver: a 304 costs headers, a 200 costs the body)
# ---------------------------------------------------------------------------


def warc_revalidation_plan(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """WARC blobs -> one row per 2xx response record with its cache
    validators: (id, url_canon, etag, last_modified, mode) where mode
    is the conditional-GET plan — 'if-none-match' when an ETag exists
    (strongest validator wins, RFC 9110 §13.1.2), else
    'if-modified-since' when Last-Modified parses to a date, else
    'unconditional'.  last_modified normalizes RFC-822-style dates to
    YYYY-MM-DD via the shared feed-date table ('' when absent).
    Non-2xx records and poison payloads drop (the route entry reports
    them).  One Arrow kernel; gz-transparent; stateless."""

    @F.pandas_udf(
        "array<struct<url: string, etag: string, last_modified: string, mode: string>>"
    )
    def _plan(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError:
                return []
            out = []
            for r in recs:
                try:
                    status, hdrs, _body = parse_http_response(r["payload"])
                    if not 200 <= status < 300:
                        continue
                    etag = hdrs.get("etag", "").strip()
                    lm = _feed_date(hdrs.get("last-modified", ""))
                    mode = (
                        "if-none-match" if etag
                        else ("if-modified-since" if lm else "unconditional")
                    )
                    out.append(
                        {"url": canonicalize_url(r["uri"]), "etag": etag,
                         "last_modified": lm, "mode": mode}
                    )
                except ValueError:
                    continue
            return out

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_plan(F.col(blob_col))).alias("r"))
        .select(id_col, F.col("r.url").alias("url_canon"), "r.etag",
                F.col("r.last_modified").alias("last_modified"), "r.mode")
    )


def synth_frontier_redirect_warc(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "warc"
) -> DataFrame:
    """Encoder twin for the frontier's redirect-collapse stage: per
    doc, a TWO-hop 301 chain rooted at the frontier's own ``/a/<id>``
    URL — ``/a/<id> -> /a/<id>/m -> /a/<id>/final`` (absolute-path then
    relative Location forms).  Closed form: the head collapses to
    ``.../a/<id>/final`` in 2 hops."""

    @F.pandas_udf("binary")
    def _build(did: pd.Series) -> pd.Series:
        out = []
        for i in did:
            i = int(i)
            host = f"site{i % 40}.example.com"
            u0 = f"https://{host}/a/{i}"
            r1 = build_warc_record(
                u0,
                (f"HTTP/1.1 301 Moved Permanently\r\nLocation: /a/{i}/m\r\n\r\n").encode(),
            )
            r2 = build_warc_record(
                f"https://{host}/a/{i}/m",
                b"HTTP/1.1 301 Moved Permanently\r\nLocation: final\r\n\r\n",
            )
            out.append(r1 + r2)
        return pd.Series(out)

    return df.withColumn(out_col, _build(F.col(id_col)))


# ---------------------------------------------------------------------------
# Sitemaps (sitemaps.org protocol — the crawl frontier's seed source)
# ---------------------------------------------------------------------------

_SM_BLOCK_RX = re.compile(r"<(url|sitemap)\b[^>]*>(.*?)</\1\s*>", re.I | re.S)
_SM_LOC_RX = re.compile(r"<loc\b[^>]*>(.*?)</loc", re.I | re.S)
_SM_LASTMOD_RX = re.compile(r"<lastmod\b[^>]*>(.*?)</lastmod", re.I | re.S)
_SM_PRIORITY_RX = re.compile(r"<priority\b[^>]*>(.*?)</priority", re.I | re.S)
_SM_DATE_RX = re.compile(r"^\d{4}-\d{2}-\d{2}")
_SM_PRI_VAL_RX = re.compile(r"^(\d+)(?:\.(\d+))?$")


def _priority_milli(s: str) -> int:
    """Sitemap <priority> (0.0–1.0 decimal string) as integer milli —
    parsed digit-wise, never through a float (0.8*1000 is not exactly
    800 in binary).  Absent/malformed -> the protocol default 0.5;
    out-of-range clamps."""
    m = _SM_PRI_VAL_RX.match((s or "").strip())
    if m is None:
        return 500
    v = int(m.group(1)) * 1000 + int((m.group(2) or "")[:3].ljust(3, "0"))
    return 0 if v < 0 else (1000 if v > 1000 else v)


def parse_sitemap(text: str) -> list[tuple[str, str, str, int]]:
    """sitemap.xml -> [(kind, loc, lastmod, priority_milli)] in document
    order; kind is 'url' (<urlset> entry) or 'sitemap' (<sitemapindex>
    entry — the recursion frontier).  A scanning parser in the house
    extractor style (sitemaps are machine-written, but crawled ones are
    still wild): case-insensitive tags, <loc> entity-decoded + trimmed,
    entries without a loc dropped, <lastmod> kept as its leading
    YYYY-MM-DD if present (else ''), <priority> via
    :func:`_priority_milli`.  Total on any str — malformed input
    degrades to fewer entries, never raises."""
    out: list[tuple[str, str, str, int]] = []
    if not isinstance(text, str):
        return out
    for m in _SM_BLOCK_RX.finditer(text):
        kind, body = m.group(1).lower(), m.group(2)
        locm = _SM_LOC_RX.search(body)
        if locm is None:
            continue
        loc = decode_entities(locm.group(1)).strip()
        if not loc:
            continue
        lm = _SM_LASTMOD_RX.search(body)
        lastmod = ""
        if lm is not None:
            dm = _SM_DATE_RX.match(lm.group(1).strip())
            if dm is not None:
                lastmod = dm.group(0)
        pm = _SM_PRIORITY_RX.search(body)
        pri = _priority_milli(pm.group(1)) if pm is not None else 500
        out.append((kind, loc, lastmod, pri))
    return out


def sitemap_entries(
    df: DataFrame, xml_col: str = "sitemap_xml", id_col: str = "doc_id"
) -> DataFrame:
    """(id, entries[]) — parsed sitemap entries as an array column the
    caller posexplodes (the link_edges shape).  One stateless Arrow
    kernel; batch and streams share it."""

    @F.pandas_udf(
        "array<struct<kind: string, loc: string, lastmod: string, priority_milli: int>>"
    )
    def _entries(xml: pd.Series) -> pd.Series:
        return xml.map(parse_sitemap)

    return df.select(F.col(id_col), _entries(F.col(xml_col)).alias("entries"))


def synth_sitemap(doc_id_col: F.Column) -> F.Column:
    """Deterministic fixture sitemap per doc, pure codegen (the
    encoder-twin pattern): docs with id % 5 == 0 are a <sitemapindex>
    (two child sitemaps, lastmod on the first only); all others a
    <urlset> with two <url> entries — the first carries an entity-
    escaped query (&amp;), uppercase scheme/host + default port (so the
    frontier chain exercises canonicalization), a lastmod and a
    priority '0.{id%10}'; the second is a bare whitespace-padded loc
    (defaults: lastmod '', priority 500).  The oracle recomputes every
    parsed field in closed form from the id arithmetic."""
    did = doc_id_col.cast("string")
    sid = (doc_id_col % F.lit(40)).cast("string")
    pg = (doc_id_col % F.lit(7)).cast("string")
    mm = F.lpad(((doc_id_col % F.lit(12)) + 1).cast("string"), 2, "0")
    dd = F.lpad(((doc_id_col % F.lit(28)) + 1).cast("string"), 2, "0")
    pri = (doc_id_col % F.lit(10)).cast("string")
    host_uc = F.concat(F.lit("SITE"), sid, F.lit(".EXAMPLE.COM:443"))
    host = F.concat(F.lit("site"), sid, F.lit(".example.com"))
    urlset = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              " <url><loc>HTTPS://"),
        host_uc,
        F.lit("/articles/"), did, F.lit("?page="), pg,
        F.lit("&amp;ref=sm</loc>\n  <lastmod>2024-"), mm, F.lit("-"), dd,
        F.lit("T09:30:00+00:00</lastmod>\n  <priority>0."), pri,
        F.lit("</priority>\n </url>\n <url>\n  <loc>\n    https://"),
        host,
        F.lit("/a/"), did,
        F.lit("\n  </loc>\n </url>\n</urlset>\n"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n'
              '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
              " <sitemap><loc>https://"),
        host,
        F.lit("/sitemap1.xml</loc><lastmod>2024-"), mm, F.lit("-"), dd,
        F.lit("</lastmod></sitemap>\n <sitemap><loc>https://"),
        host,
        F.lit("/sitemap2.xml</loc></sitemap>\n</sitemapindex>\n"),
    )
    return F.when(doc_id_col % 5 == 0, index).otherwise(urlset)


def expand_sitemap_frontier(
    seeds: DataFrame,
    store: DataFrame,
    url_col: str = "url",
    xml_col: str = "xml",
    max_depth: int = 2,
) -> DataFrame:
    """Recursive <sitemapindex> expansion (r11 — the discovery loop's
    unexpanded edge: real site sitemaps are index trees, sometimes
    cyclic, sometimes dangling): starting from seed sitemap urls,
    repeatedly join the frontier against the fetch ``store`` (url ->
    xml — at 100 TB the fetched-sitemaps table, keyed by the canonical
    url it is addressed by anyway), parse with the REAL scanning
    parser, emit page entries, and push newly-discovered child
    sitemaps (canonicalized) into the next round's frontier.

    Returns (loc, kind, lastmod, priority_milli, depth) where kind is
    'page' (a <urlset> entry; depth = the parse round that found it),
    'unfetched' (a child sitemap missing from the store — VISIBLE, the
    marker discipline), or 'depth-capped' (a child beyond ``max_depth``
    rounds — visible, never silently dropped).  Cycles and re-listed
    sitemaps dedup against the accumulated seen set (no row: not new
    work, exactly like dedup keepers).

    Scale shape: ``max_depth``+1 bounded rounds (real trees are 2-3
    deep), each ONE url-equi join against the store + one Arrow parse
    kernel; frontier and seen are localCheckpointed per round (the
    iterative-loop rule); no driver-side row inspection at all — empty
    frontiers simply produce empty parts."""
    out_schema = ("loc string, kind string, lastmod string, "
                  "priority_milli int, depth int")
    empty = seeds.sparkSession.createDataFrame([], out_schema)
    st = store.select(F.col(url_col).alias("_u"), F.col(xml_col).alias("_x"))
    frontier = (
        seeds.select(F.col(url_col).alias("_u")).distinct()
        .withColumn("_d", F.lit(0)).localCheckpoint()
    )
    seen = frontier.select("_u").localCheckpoint()
    parts: list[DataFrame] = [empty]
    for d in range(int(max_depth) + 1):
        joined = frontier.join(st, "_u", "left")
        parts.append(
            joined.filter(F.col("_x").isNull()).select(
                F.col("_u").alias("loc"), F.lit("unfetched").alias("kind"),
                F.lit("").alias("lastmod"), F.lit(-1).cast("int").alias("priority_milli"),
                F.col("_d").cast("int").alias("depth"),
            )
        )
        ent = (
            sitemap_entries(
                joined.filter(F.col("_x").isNotNull()).select("_u", "_d", "_x"),
                xml_col="_x", id_col="_d",
            )
            .select("_d", F.explode("entries").alias("e"))
        )
        parts.append(
            ent.filter(F.col("e.kind") == "url").select(
                F.col("e.loc").alias("loc"), F.lit("page").alias("kind"),
                F.col("e.lastmod").alias("lastmod"),
                F.col("e.priority_milli").cast("int").alias("priority_milli"),
                F.col("_d").cast("int").alias("depth"),
            )
        )
        kids = url_canonicalize(
            ent.filter(F.col("e.kind") == "sitemap")
            .select(F.col("e.loc").alias("url"), (F.col("_d") + 1).alias("_d")),
            url_col="url", out_col="_u",
        ).select("_u", "_d").distinct()
        nxt = kids.join(seen, "_u", "left_anti").localCheckpoint()
        if d == int(max_depth):
            parts.append(
                nxt.select(
                    F.col("_u").alias("loc"), F.lit("depth-capped").alias("kind"),
                    F.lit("").alias("lastmod"),
                    F.lit(-1).cast("int").alias("priority_milli"),
                    F.col("_d").cast("int").alias("depth"),
                )
            )
        else:
            frontier = nxt
            seen = seen.unionByName(nxt.select("_u")).distinct().localCheckpoint()
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Anchor text (the classic per-target relevance/quality signal)
# ---------------------------------------------------------------------------


def _strip_tags_collapse(s: str) -> str:
    """Inner-markup -> text: drop <...> tags (quote-aware, same scan as
    the extractor), entity-decode, collapse ASCII whitespace."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "<":
            q = None
            i += 1
            while i < n:
                ch = s[i]
                if q:
                    if ch == q:
                        q = None
                elif ch in "\"'":
                    q = ch
                elif ch == ">":
                    break
                i += 1
            i += 1
            continue
        out.append(c)
        i += 1
    return re.sub(r"[ \t\n\r\f\v]+", " ", decode_entities("".join(out))).strip()


def extract_anchors(html: str) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs, document order — href exactly as
    :func:`extract_links` reports it (same scanner, same multiplicity,
    pinned in pytest), anchor_text = the inner markup up to the next
    ``</a`` with tags stripped, entities decoded, ASCII whitespace
    collapsed ('' for unterminated anchors).  The scan position
    advances past the OPEN tag only (matching extract_links), so a
    nested anchor still yields its own entry; the outer's text then
    includes the nested text — the browser auto-close approximation,
    documented.  Total on any str."""
    out: list[tuple[str, str]] = []
    lower = html.lower()
    i, n = 0, len(html)
    while True:
        i = lower.find("<a", i)
        if i < 0:
            break
        j = i + 2
        if j < n and (html[j].isalnum() or html[j] in "-:"):
            i = j
            continue
        q, e = None, j
        while e < n:
            c = html[e]
            if q:
                if c == q:
                    q = None
            elif c in "\"'":
                q = c
            elif c == ">":
                break
            e += 1
        if e >= n:
            break
        attrs = html[j:e]
        m = re.search(
            r"""href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", attrs, re.IGNORECASE
        )
        if m:
            href = decode_entities(m.group(2) or m.group(3) or m.group(4) or "")
            # find the true </a> close: "</a" also prefixes </abbr>,
            # </article>, </aside>, ... — mirror the open-tag name check
            # (the char after must NOT continue a tag name)
            close = e + 1
            while True:
                close = lower.find("</a", close)
                if close < 0:
                    break
                nc = lower[close + 3 : close + 4]
                if nc and (nc.isalnum() or nc in "-:"):
                    close += 3
                    continue
                break
            text = _strip_tags_collapse(html[e + 1 : close]) if close >= 0 else ""
            out.append((href, text))
        i = e + 1
    return out


def anchor_edges(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "base_url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, base, html) -> one row per out-link with its anchor text:
    (id, href, url_canon, atext) — the link_edges projection plus the
    per-edge relevance signal.  One Arrow kernel + codegen explode;
    stateless (stream-safe)."""

    @F.pandas_udf("array<struct<href: string, url: string, atext: string>>")
    def _anchors(html: pd.Series, base: pd.Series) -> pd.Series:
        def one(h, b):
            if not isinstance(h, str):
                return []
            b = b if isinstance(b, str) else ""
            return [
                {"href": l, "url": canonicalize_url(resolve_url(b, l)), "atext": t}
                for l, t in extract_anchors(h)
            ]

        return pd.Series([one(h, b) for h, b in zip(html, base)])

    return (
        df.select(
            F.col(id_col),
            F.explode(_anchors(F.col(html_col), F.col(base_col))).alias("lk"),
        )
        .select(id_col, "lk.href", F.col("lk.url").alias("url_canon"),
                F.col("lk.atext").alias("atext"))
    )


def anchor_target_profile(edges: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-target anchor profile over an (id, url_canon, atext) edge
    table: in-link count, distinct source docs, total anchor tokens,
    and the modal anchor text (count DESC, text ASC — deterministic).
    Two aggregations + one window, ALL keyed by url_canon, so the
    shuffle exchange is planned once and reused — the natural
    per-target partitioning a 100 TB link table would already have.
    The edge relation feeds BOTH aggregates, and the two exchanges
    differ, so without a cut the extraction kernel runs twice (the
    banded_signatures / dsir_scores lesson): localCheckpoint it once —
    values bit-identical."""
    from pyspark.sql.window import Window

    edges = edges.localCheckpoint()
    prof = edges.groupBy("url_canon").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_links"),
        F.countDistinct(id_col).cast("bigint").alias("n_src"),
        F.sum(
            F.when(F.length("atext") == 0, F.lit(0)).otherwise(
                F.size(F.split("atext", " "))
            )
        ).cast("bigint").alias("anchor_tokens"),
    )
    tops = edges.groupBy("url_canon", "atext").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("url_canon").orderBy(
        F.col("c").desc(), F.col("atext").asc()
    )
    top1 = (
        tops.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("url_canon", F.col("atext").alias("top_anchor"))
    )
    return prof.join(top1, "url_canon")


# ---------------------------------------------------------------------------
# Image-caption pairs (LAION-shaped multimodal training-data harvest)
# ---------------------------------------------------------------------------

_IMG_SRC_RX = re.compile(
    r"""src\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_IMG_ALT_RX = re.compile(
    r"""alt\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)


def extract_image_refs(html: str) -> list[tuple[str, str]]:
    """(src, alt_text) of every ``<img>`` tag, document order — the
    LAION-style multimodal pair harvest.  Same quote-aware tag scan as
    the anchor/extractor family; src entity-decoded (hrefs and srcs
    legally carry &amp;), alt entity-decoded + ASCII-whitespace
    collapsed ('' when absent); tags without a src are skipped
    (nothing to pair).  Total on any str."""
    out: list[tuple[str, str]] = []
    lower = html.lower()
    i, n = 0, len(html)
    while True:
        i = lower.find("<img", i)
        if i < 0:
            break
        j = i + 4
        if j < n and (html[j].isalnum() or html[j] in "-:"):
            i = j
            continue
        q, e = None, j
        while e < n:
            c = html[e]
            if q:
                if c == q:
                    q = None
            elif c in "\"'":
                q = c
            elif c == ">":
                break
            e += 1
        if e >= n:
            break
        attrs = html[j:e]
        m = _IMG_SRC_RX.search(attrs)
        if m:
            src = decode_entities(m.group(2) or m.group(3) or m.group(4) or "")
            am = _IMG_ALT_RX.search(attrs)
            alt = ""
            if am:
                alt = re.sub(
                    r"[ \t\n\r\f\v]+",
                    " ",
                    decode_entities(am.group(2) or am.group(3) or am.group(4) or ""),
                ).strip()
            if src:
                out.append((src, alt))
        i = e + 1
    return out


def image_caption_pairs(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "base_url",
    id_col: str = "doc_id",
    min_alt_tokens: int = 0,
) -> DataFrame:
    """(id, base, html) -> one row per <img>: (id, img_url, alt,
    alt_tokens) with src resolved against the page base and
    canonicalized — the (image URL, caption) candidate table a
    multimodal pipeline fetches and CLIP-filters downstream.
    ``min_alt_tokens`` > 0 applies the LAION-style caption gate (drop
    pairs whose alt text is too short to supervise anything); the gate
    is a codegen filter AFTER the kernel so Catalyst fuses it into the
    same stage.  One Arrow kernel + explode; stateless (stream-safe)."""

    @F.pandas_udf("array<struct<url: string, alt: string>>")
    def _imgs(html: pd.Series, base: pd.Series) -> pd.Series:
        def one(h, b):
            if not isinstance(h, str):
                return []
            b = b if isinstance(b, str) else ""
            return [
                {"url": canonicalize_url(resolve_url(b, s)), "alt": a}
                for s, a in extract_image_refs(h)
            ]

        return pd.Series([one(h, b) for h, b in zip(html, base)])

    pairs = (
        df.select(
            F.col(id_col),
            F.explode(_imgs(F.col(html_col), F.col(base_col))).alias("im"),
        )
        .select(
            id_col,
            F.col("im.url").alias("img_url"),
            F.col("im.alt").alias("alt"),
            F.when(F.length("im.alt") == 0, F.lit(0))
            .otherwise(F.size(F.split("im.alt", " ")))
            .cast("int")
            .alias("alt_tokens"),
        )
    )
    if min_alt_tokens > 0:
        pairs = pairs.filter(F.col("alt_tokens") >= min_alt_tokens)
    return pairs


def warc_caption_media_rows(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """Tagged multimodal rows from raw WARC bytes: html records yield
    one 'cap' row per <img> (caption url resolved against the RECORD
    uri + canonicalized, alt text), image records yield one 'img' row
    (canonical uri, decoded width/height, int64 pixel sum via the
    from-scratch codecs).  Poison records quarantine per-record
    (ValueError only — the codecs contract), never the stage.  One
    Arrow kernel + explode; stateless."""
    from esgopeta_spark.operators import codecs

    @F.pandas_udf(
        "array<struct<kind: string, url: string, alt: string, w: int, h: int, px: bigint>>"
    )
    def _rows(s: pd.Series) -> pd.Series:
        image = {"png": codecs.decode_png, "bmp": codecs.decode_bmp,
                 "ppm": codecs.decode_ppm, "gif": codecs.decode_gif,
                 "tiff": codecs.decode_tiff, "jpeg": codecs.decode_jpeg}

        def one_record(r):
            out = []
            try:
                _status, hdrs, body = parse_http_response(r["payload"])
                kind = sniff_payload(body)
                if kind == "html":
                    text = decode_html_bytes(body, hdrs)
                    for src, alt in extract_image_refs(text):
                        out.append(
                            {"kind": "cap",
                             "url": canonicalize_url(resolve_url(r["uri"], src)),
                             "alt": alt, "w": -1, "h": -1, "px": -1}
                        )
                elif kind in image:
                    arr = image[kind](body)
                    out.append(
                        {"kind": "img", "url": canonicalize_url(r["uri"]),
                         "alt": "", "w": int(arr.shape[1]), "h": int(arr.shape[0]),
                         "px": int(arr.astype("int64").sum())}
                    )
            except ValueError:
                pass  # poison record costs itself, not the stage
            return out

        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError:
                return []
            rows = []
            for r in recs:
                rows.extend(one_record(r))
            return rows

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_rows(F.col(blob_col))).alias("r"))
        .select(id_col, "r.kind", "r.url", "r.alt", "r.w", "r.h", "r.px")
    )


def caption_media_pairs(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """Raw WARC bytes -> (caption, decoded image) training pairs: the
    'cap' rows (from html records) equi-join the 'img' rows (from image
    records) on the canonical image URL — the LAION-shaped multimodal
    curation capstone running entirely on this repo's scanners and
    codecs.  The tagged relation feeds both join sides, so it is
    localCheckpointed once (the anchor-profile lesson); the join is a
    plain url-equi hash join — at 100 TB both sides partition by the
    image URL, the key the fetch store is addressed by anyway."""
    rows = warc_caption_media_rows(df, blob_col, id_col).localCheckpoint()
    caps = rows.filter(F.col("kind") == "cap").select(
        id_col, F.col("url").alias("img_url"), "alt"
    )
    imgs = rows.filter(F.col("kind") == "img").select(
        F.col("url").alias("img_url"),
        F.col("w").alias("width"),
        F.col("h").alias("height"),
        F.col("px").alias("px_sum"),
    )
    return caps.join(imgs, "img_url").select(
        id_col, "img_url", "alt", "width", "height", "px_sum"
    )


# ---------------------------------------------------------------------------
# Syndication feeds (RSS 2.0 / Atom — the discovery trio's third leg)
# ---------------------------------------------------------------------------

_FEED_ITEM_RX = re.compile(r"<(item|entry)\b[^>]*>(.*?)</\1\s*>", re.I | re.S)
_FEED_TITLE_RX = re.compile(r"<title\b[^>]*>(.*?)</title", re.I | re.S)
_FEED_LINK_TEXT_RX = re.compile(r"<link\b[^>]*>(.*?)</link", re.I | re.S)
_FEED_LINK_HREF_RX = re.compile(
    r"""<link\b[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I | re.S
)
_FEED_PUBDATE_RX = re.compile(r"<pubDate\b[^>]*>(.*?)</pubDate", re.I | re.S)
_FEED_UPDATED_RX = re.compile(r"<updated\b[^>]*>(.*?)</updated", re.I | re.S)
_RFC822_DATE_RX = re.compile(
    r"(\d{1,2})\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+(\d{4})",
    re.I,
)
_MONTHS = {m: i + 1 for i, m in enumerate(
    ["jan", "feb", "mar", "apr", "may", "jun",
     "jul", "aug", "sep", "oct", "nov", "dec"])}


def _feed_date(s: str) -> str:
    """Normalize a feed timestamp to YYYY-MM-DD: ISO strings keep their
    leading date, RFC 822 ('Tue, 05 Mar 2024 09:30:00 GMT') is mapped
    through the month table.  Unparseable -> ''."""
    s = s.strip()
    m = _SM_DATE_RX.match(s)
    if m is not None:
        return m.group(0)
    m = _RFC822_DATE_RX.search(s)
    if m is not None:
        return f"{int(m.group(3)):04d}-{_MONTHS[m.group(2).lower()]:02d}-{int(m.group(1)):02d}"
    return ""


def parse_feed(text: str) -> list[tuple[str, str, str, str]]:
    """RSS 2.0 / Atom feed -> [(kind, title, link, published)] in
    document order; kind is 'rss' (<item>) or 'atom' (<entry>).  Same
    scanning-parser family as parse_sitemap: titles entity-decoded +
    whitespace-collapsed, links entity-decoded (RSS <link>text</link>
    inner text, Atom <link href=...> attribute — checked in that
    order per entry), dates normalized to YYYY-MM-DD (ISO prefix or
    RFC 822 via the month table), entries without a link dropped
    (nothing to crawl).  Links are NOT resolved/canonicalized here —
    that is the frontier's job (link_edges discipline).  Total on any
    str."""
    out: list[tuple[str, str, str, str]] = []
    if not isinstance(text, str):
        return out
    for m in _FEED_ITEM_RX.finditer(text):
        kind = "rss" if m.group(1).lower() == "item" else "atom"
        body = m.group(2)
        link = ""
        lm = _FEED_LINK_TEXT_RX.search(body)
        if lm is not None and lm.group(1).strip():
            link = decode_entities(lm.group(1)).strip()
        else:
            hm = _FEED_LINK_HREF_RX.search(body)
            if hm is not None:
                link = decode_entities(
                    hm.group(2) or hm.group(3) or hm.group(4) or ""
                ).strip()
        if not link:
            continue
        tm = _FEED_TITLE_RX.search(body)
        title = ""
        if tm is not None:
            title = re.sub(
                r"[ \t\n\r\f\v]+", " ", decode_entities(tm.group(1))
            ).strip()
        dm = _FEED_PUBDATE_RX.search(body) or _FEED_UPDATED_RX.search(body)
        published = _feed_date(dm.group(1)) if dm is not None else ""
        out.append((kind, title, link, published))
    return out


def feed_entries(
    df: DataFrame, xml_col: str = "feed_xml", id_col: str = "doc_id"
) -> DataFrame:
    """(id, entries[]) — parsed feed entries as an array column the
    caller posexplodes (the sitemap_entries shape).  One stateless
    Arrow kernel; batch and streams share it."""

    @F.pandas_udf(
        "array<struct<kind: string, title: string, link: string, published: string>>"
    )
    def _entries(xml: pd.Series) -> pd.Series:
        return xml.map(parse_feed)

    return df.select(F.col(id_col), _entries(F.col(xml_col)).alias("entries"))


def synth_conditional_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    uri_col: str = "uri",
    page_col: str = "page",
    out_col: str = "warc",
) -> DataFrame:
    """Encoder-twin fixture for the conditional-fetch entry: ids with
    id%3==0 answer the revalidation with ``304 Not Modified`` (empty
    body + ETag — the bandwidth the conditional GET saved); the rest
    ship a fresh ``200`` body.  One WARC response record per doc."""

    @F.pandas_udf("binary")
    def _build(did: pd.Series, uri: pd.Series, page: pd.Series) -> pd.Series:
        def one(d, u, p):
            d = int(d)
            if d % 3 == 0:
                payload = (
                    f'HTTP/1.1 304 Not Modified\r\nETag: "e{d}"\r\n\r\n'
                ).encode("latin-1")
            else:
                body = (p if isinstance(p, str) else "").encode("utf-8")
                payload = (
                    f"HTTP/1.1 200 OK\r\nContent-Length: {len(body)}\r\n\r\n"
                ).encode("latin-1") + body
            return build_warc_record(u if isinstance(u, str) else "", payload)

        return pd.Series([one(d, u, p) for d, u, p in zip(did, uri, page)])

    return df.withColumn(
        out_col, _build(F.col(id_col), F.col(uri_col), F.col(page_col))
    )


_XROBOTS_DIRECTIVES = {
    "noindex", "nofollow", "none", "noarchive", "nosnippet",
    "notranslate", "noimageindex", "all", "index", "follow",
}

# Directives that legitimately take a ':'-separated value (RFC-less but
# documented by every major engine).  A leading token from this set is a
# directive, NOT an agent scope — 'max-snippet: 20, noindex' must keep
# its noindex (r12 ADVICE: the old code dropped the whole header).
_XROBOTS_VALUE_DIRECTIVES = {
    "max-snippet", "max-image-preview", "max-video-preview",
    "unavailable_after",
}


def parse_xrobots(value: str) -> tuple[int, int]:
    """(noindex, nofollow) from one ``X-Robots-Tag`` header value — the
    HEADER-level robots directive (how non-HTML documents, PDFs above
    all, get noindexed; the meta tag can't ride a PDF).  Comma-token
    list, case-insensitive, ``none`` = both; an AGENT-SCOPED value
    (``googlebot: noindex`` — prefix before ':' is neither a flag nor a
    value-taking directive) is for someone else and is ignored, exactly
    like a scoped meta name; value-taking directives
    (``max-snippet: 20``, ``unavailable_after: <date>``) parse as their
    own (ignored) tokens without scoping the rest of the list.  Total
    on any str."""
    v = (value or "").strip()
    head = v.split(":", 1)[0].strip().lower()
    if ":" in v and head not in _XROBOTS_DIRECTIVES \
            and head not in _XROBOTS_VALUE_DIRECTIVES and "," not in head:
        return 0, 0  # agent-scoped: not addressed to us
    noindex = nofollow = 0
    for tok in v.lower().split(","):
        tok = tok.split(":", 1)[0].strip()
        if tok == "none":
            noindex = nofollow = 1
        elif tok == "noindex":
            noindex = 1
        elif tok == "nofollow":
            nofollow = 1
    return noindex, nofollow


def warc_robots_directives(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """Per WARC record, the COMBINED page-level robots verdict (r12 —
    completes the indexability chain: RFC 9309 robots.txt gates the
    FETCH, meta robots gates HTML pages, X-Robots-Tag gates everything
    else, PDFs above all): unwrap the HTTP message, read the
    ``X-Robots-Tag`` header, read ``<meta name=robots>`` from html
    bodies (charset-sniffed decode, the prescan discipline), and union
    (most-restrictive-wins).  One Arrow kernel over one scan,
    shuffle-free; poison records quarantine to a VISIBLE all--1 row."""

    @F.pandas_udf(
        "array<struct<uri: string, hdr_noindex: int, hdr_nofollow: int, "
        "meta_noindex: int, meta_nofollow: int, noindex: int, nofollow: int>>"
    )
    def _gate(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError:
                return [{"uri": "error", "hdr_noindex": -1, "hdr_nofollow": -1,
                         "meta_noindex": -1, "meta_nofollow": -1,
                         "noindex": -1, "nofollow": -1}]
            out = []
            for r in recs:
                try:
                    _status, hdrs, body = parse_http_response(r["payload"])
                    hn, hf = parse_xrobots(hdrs.get("x-robots-tag", ""))
                    mn = mf = 0
                    if sniff_payload(bytes(body)) == "html":
                        mn, mf = meta_robots(decode_html_bytes(bytes(body), hdrs))
                    out.append({
                        "uri": r["uri"], "hdr_noindex": hn, "hdr_nofollow": hf,
                        "meta_noindex": mn, "meta_nofollow": mf,
                        "noindex": int(bool(hn or mn)),
                        "nofollow": int(bool(hf or mf)),
                    })
                except ValueError:
                    out.append({"uri": r["uri"], "hdr_noindex": -1,
                                "hdr_nofollow": -1, "meta_noindex": -1,
                                "meta_nofollow": -1, "noindex": -1,
                                "nofollow": -1})
            return out

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_gate(F.col(blob_col))).alias("r"))
        .select(id_col, "r.uri", "r.hdr_noindex", "r.hdr_nofollow",
                "r.meta_noindex", "r.meta_nofollow", "r.noindex", "r.nofollow")
    )


def synth_xrobots_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    uri_col: str = "uri",
    out_col: str = "warc",
) -> DataFrame:
    """Encoder-twin fixture for the header/meta robots gate: header
    class id%5 (none / noindex / 'nofollow, noarchive' / agent-scoped
    'googlebot: noindex' which MUST be ignored / 'max-snippet: -1,
    noindex' whose value-taking directive must NOT scope away the
    noindex — the r12 ADVICE regression class), meta class (id//5)%3
    (none / noindex / 'none' = both), id%23==1 ships poison."""

    @F.pandas_udf("binary")
    def _build(did: pd.Series, uri: pd.Series) -> pd.Series:
        def one(d, u):
            d = int(d)
            if d % 23 == 1:
                return b"not a warc"
            hc, mc = d % 5, (d // 5) % 3
            hdr = {1: 'X-Robots-Tag: noindex\r\n',
                   2: 'X-Robots-Tag: nofollow, noarchive\r\n',
                   3: 'X-Robots-Tag: googlebot: noindex\r\n',
                   4: 'X-Robots-Tag: max-snippet: -1, noindex\r\n'}.get(hc, "")
            meta = {1: '<meta name="robots" content="noindex">',
                    2: "<meta name='robots' content='none'>"}.get(mc, "")
            body = (f"<!DOCTYPE html><html><head>{meta}</head>"
                    f"<body><p>doc {d}</p></body></html>").encode()
            payload = (
                f"HTTP/1.1 200 OK\r\n{hdr}Content-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("latin-1") + body
            return build_warc_record(u if isinstance(u, str) else "", payload)

        return pd.Series([one(d, u) for d, u in zip(did, uri)])

    return df.withColumn(out_col, _build(F.col(id_col), F.col(uri_col)))


def warc_fetch_records(
    warc: DataFrame,
    blob_col: str = "warc",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, warc-blob) -> one row per record (id, uri, status, body_md5)
    — the revalidation parse projection (r12: extracted so the batch
    merge and the streaming twin SHARE it; stateless Arrow kernel, runs
    on streams AS-IS).  Poison blobs/records quarantine to visible
    status=-1 rows."""
    import hashlib

    @F.pandas_udf(
        "array<struct<uri: string, status: int, body_md5: string>>"
    )
    def _parse(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError as exc:
                return [{"uri": str(exc)[:80], "status": -1, "body_md5": ""}]
            out = []
            for r in recs:
                try:
                    status, _h, body = parse_http_response(r["payload"])
                    out.append({
                        "uri": r["uri"], "status": status,
                        "body_md5": hashlib.md5(bytes(body)).hexdigest(),
                    })
                except ValueError:
                    out.append({"uri": r["uri"], "status": -1, "body_md5": ""})
            return out

        return pd.Series([one(b) for b in s])

    return (
        warc.select(F.col(id_col), F.explode(_parse(F.col(blob_col))).alias("r"))
        .select(id_col, "r.uri", "r.status", "r.body_md5")
    )


def conditional_fetch_merge(
    warc: DataFrame,
    store: DataFrame,
    blob_col: str = "warc",
    id_col: str = "doc_id",
    store_url_col: str = "url",
    store_md5_col: str = "page_md5",
) -> DataFrame:
    """The receive side of HTTP revalidation (RFC 9110 §15.4.5 — the
    step after ``warc_revalidation_plan`` sends its conditional GETs):
    a ``304 Not Modified`` carries NO body, so the document is the
    STORED copy — resolve it with one url-equi left join against the
    fetch store; a ``200`` ships fresh bytes (source 'network'); a 304
    whose url the store has lost emits a VISIBLE 'miss' row (refetch
    unconditionally), never a silent drop.  One Arrow parse kernel +
    ONE equi join for every row class — no split/re-union, so the
    kernel relation is consumed once.  Poison records quarantine."""
    parsed = warc_fetch_records(warc, blob_col, id_col)
    st = store.select(
        F.col(store_url_col).alias("uri"),
        F.col(store_md5_col).alias("_stored_md5"),
    )
    j = parsed.join(st, "uri", "left")
    source = (
        F.when(F.col("status") == 200, F.lit("network"))
        .when(
            (F.col("status") == 304) & F.col("_stored_md5").isNotNull(),
            F.lit("cache"),
        )
        .when(F.col("status") == 304, F.lit("miss"))
        .otherwise(F.lit("error"))
    )
    page_md5 = (
        F.when(F.col("status") == 200, F.col("body_md5"))
        .when(
            (F.col("status") == 304) & F.col("_stored_md5").isNotNull(),
            F.col("_stored_md5"),
        )
        .otherwise(F.lit(""))
    )
    return j.select(
        id_col, "uri", "status",
        source.alias("fetch_source"), page_md5.alias("page_md5"),
    )


def synth_paired_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    uri_col: str = "uri",
    page_col: str = "page",
    out_col: str = "warc",
) -> DataFrame:
    """Encoder-twin fixture for request/response pairing: per doc ONE
    blob holding the request record (``<urn:req:{id}>``, a GET message)
    followed by its response (``WARC-Concurrent-To`` pointing back) —
    the record-pair layout real crawlers write (ISO 28500 §6.3.2).
    Docs with id%7==3 get a response whose Concurrent-To points at a
    request that is NOT in the blob (the dangling class the pairing
    must surface, not drop)."""

    @F.pandas_udf("binary")
    def _build(did: pd.Series, uri: pd.Series, page: pd.Series) -> pd.Series:
        def one(d, u, p):
            d = int(d)
            u = u if isinstance(u, str) else ""
            body = (p if isinstance(p, str) else "").encode("utf-8")
            path = u.split(".com", 1)[-1] if ".com" in u else "/"
            req_payload = (
                f"GET {path} HTTP/1.1\r\nHost: example\r\n\r\n"
            ).encode("latin-1")
            resp_payload = (
                f"HTTP/1.1 200 OK\r\nContent-Length: {len(body)}\r\n\r\n"
            ).encode("latin-1") + body
            req_id = f"<urn:req:{d}>"
            blob = b""
            if d % 7 != 3:
                blob += build_warc_record(
                    u, req_payload, rec_type="request", rec_id=req_id
                )
            blob += build_warc_record(
                u, resp_payload, rec_type="response",
                rec_id=f"<urn:resp:{d}>", concurrent_to=req_id,
            )
            return blob

        return pd.Series([one(d, u, p) for d, u, p in zip(did, uri, page)])

    return df.withColumn(
        out_col, _build(F.col(id_col), F.col(uri_col), F.col(page_col))
    )


def warc_request_pairs(
    df: DataFrame, blob_col: str = "warc", id_col: str = "doc_id"
) -> DataFrame:
    """Pair each WARC ``response`` with the ``request`` that produced
    it via ``WARC-Concurrent-To`` (ISO 28500 §5.7) — the step that
    recovers the request METHOD and exact request path for response
    records (politeness audits, POST filtering, soft-404 analysis all
    need the request side).  Pairing is KERNEL-LOCAL: a crawler writes
    the pair adjacently in one file, so the join never shuffles.  A
    response whose request is missing from the blob emits a VISIBLE
    unpaired row (method/path '', paired=0), never a silent drop.
    Poison blobs quarantine.  One Arrow kernel + explode,
    shuffle-free; stateless (stream-safe)."""

    @F.pandas_udf(
        "array<struct<uri: string, method: string, path: string,"
        " status: int, n_body: bigint, paired: int>>"
    )
    def _pairs(s: pd.Series) -> pd.Series:
        def one(b):
            try:
                recs = parse_warc(maybe_gunzip_warc(bytes(b) if b is not None else b""))
            except ValueError as exc:
                return [{"uri": str(exc)[:80], "method": "", "path": "",
                         "status": -1, "n_body": -1, "paired": 0}]
            reqs = {}
            for r in recs:
                if r["type"] == "request" and r["rec_id"]:
                    line = bytes(r["payload"]).split(b"\r\n", 1)[0]
                    parts = line.decode("latin-1", "replace").split(" ")
                    if len(parts) >= 2:
                        reqs[r["rec_id"]] = (parts[0], parts[1])
            out = []
            for r in recs:
                if r["type"] != "response":
                    continue
                try:
                    status, _h, body = parse_http_response(r["payload"])
                except ValueError:
                    out.append({"uri": r["uri"], "method": "", "path": "",
                                "status": -1, "n_body": -1, "paired": 0})
                    continue
                m = reqs.get(r["concurrent_to"])
                out.append({
                    "uri": r["uri"],
                    "method": m[0] if m else "",
                    "path": m[1] if m else "",
                    "status": status,
                    "n_body": len(body),
                    "paired": 1 if m else 0,
                })
            return out

        return pd.Series([one(b) for b in s])

    return (
        df.select(F.col(id_col), F.explode(_pairs(F.col(blob_col))).alias("r"))
        .select(id_col, "r.uri", "r.method", "r.path", "r.status",
                "r.n_body", "r.paired")
    )


# soft-404 content phrases (lowercase substring probes — the classic
# crawl-QA heuristic set; a trained classifier would sit downstream)
_SOFT404_PHRASES = (
    "page not found", "404 not found", "does not exist",
    "no longer available", "page cannot be found",
)


def soft404_flags(
    df: DataFrame,
    status_col: str = "status",
    text_col: str = "clean_text",
    id_col: str = "doc_id",
    short_chars: int = 120,
) -> DataFrame:
    """Soft-404 detection — the crawl-QA cut after extraction: a server
    that answers 200 with an error PAGE poisons dedup (thousands of
    hosts share one 'not found' template) and wastes training tokens.
    Signals, all codegen: any of the classic error phrases in the
    lowercased clean text (``phrase_hit``), a very short body
    (``short_body``), and the verdict ``soft404`` = 200-status AND
    phrase hit (shortness alone is NOT an error signal — stub pages
    are real content; it rides along for the threshold study).  Real
    4xx/5xx rows are ``hard_error`` instead — already visible, no
    content model needed.  One projection, no kernel, no shuffle;
    stateless (stream-safe)."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    hit = None
    for ph in _SOFT404_PHRASES:
        h = F.contains(low, F.lit(ph))
        hit = h if hit is None else (hit | h)
    status = F.col(status_col)
    return df.select(
        F.col(id_col),
        status.cast("int").alias("status"),
        hit.cast("int").alias("phrase_hit"),
        (F.length(low) < F.lit(int(short_chars))).cast("int")
        .alias("short_body"),
        ((status == 200) & hit).cast("int").alias("soft404"),
        ((status >= 400)).cast("int").alias("hard_error"),
    )


def synth_zstd_blobs(
    df: DataFrame,
    id_col: str = "doc_id",
    page_col: str = "page",
    out_col: str = "blob",
) -> DataFrame:
    """Encoder-twin fixture for the HOUSE zstd-decoder entry: per doc
    the page's UTF-8 bytes compressed by libzstd (pyarrow) at a
    per-class level — 1 (fast path: raw/rle-heavy blocks), 3, 9, 19
    (max: stream-described FSE tables, treeless blocks, 4-stream
    literals) — so the from-scratch decoder faces every block shape
    the reference encoder emits; id%23==1 ships a TRUNCATED frame
    (last 4 bytes cut — with the declared content size this fails
    DETERMINISTICALLY, unlike a byte flip whose effect the oracle
    could not predict) that must quarantine visibly."""

    @F.pandas_udf("binary")
    def _build(did: pd.Series, page: pd.Series) -> pd.Series:
        import pyarrow as _pa

        levels = [1, 3, 9, 19]

        def one(d, p):
            d = int(d)
            body = (p if isinstance(p, str) else "").encode("utf-8")
            comp = _pa.Codec(
                "zstd", compression_level=levels[d % 4]
            ).compress(body, asbytes=True)
            if d % 23 == 1:
                return comp[:-4]
            return comp

        return pd.Series([one(d, p) for d, p in zip(did, page)])

    return df.withColumn(out_col, _build(F.col(id_col), F.col(page_col)))


def zstd_house_digest(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Decode zstd blobs through the FROM-SCRATCH RFC 8878 decoder
    (operators/zstd.py — explicitly NOT the pyarrow fast path, which
    the Content-Encoding unwrap prefers at scale) and emit the
    recovered page's md5 + length; a frame that fails to decode
    quarantines to a VISIBLE (ok=0, '', -1) row.  One Arrow kernel
    over one scan, shuffle-free; stateless (streams as-is)."""
    import hashlib

    from esgopeta_spark.operators.zstd import zstd_decompress

    @F.pandas_udf("struct<ok: int, page_md5: string, n_chars: bigint>")
    def _digest(s: pd.Series) -> pd.DataFrame:
        oks, md5s, ns = [], [], []
        for b in s:
            try:
                body = zstd_decompress(bytes(b) if b is not None else b"")
                text = body.decode("utf-8")
                oks.append(1)
                md5s.append(hashlib.md5(text.encode("utf-8")).hexdigest())
                ns.append(len(text))
            except (ValueError, UnicodeDecodeError):
                oks.append(0)
                md5s.append("")
                ns.append(-1)
        return pd.DataFrame({"ok": oks, "page_md5": md5s, "n_chars": ns})

    out = df.select(F.col(id_col), _digest(F.col(blob_col)).alias("_d"))
    return out.select(id_col, "_d.ok", "_d.page_md5", "_d.n_chars")


def zstd_house_roundtrip(
    df: DataFrame,
    id_col: str = "doc_id",
    page_col: str = "page",
) -> DataFrame:
    """HOUSE zstd ENCODER, driver-visible (r14 — the write side of the
    RFC 8878 loop): per doc the page's UTF-8 bytes are compressed by
    the from-scratch encoder (operators/zstd.py zstd_compress) at a
    per-class level — 1/3/9/19 by id%4, spanning raw/RLE blocks,
    Huffman 1- and 4-stream literals, and RLE/predefined/
    stream-described FSE sequence tables — then decoded by the
    REFERENCE decoder (libzstd via pyarrow), which is the authority:
    md5 + length are over the libzstd-recovered text, so one wrong bit
    in any table description or backstream mismatches the closed-form
    oracle.  ``house_agree`` additionally pins the house decoder to
    the same bytes (encoder->decoder self-consistency rides along but
    never substitutes for the reference).  id%23==1 truncates the
    house frame before decode and must quarantine to the visible
    (0, '', -1, 0) row.  One Arrow kernel over one scan,
    shuffle-free; stateless (streams as-is)."""
    import hashlib

    from esgopeta_spark.operators.zstd import zstd_compress, zstd_decompress

    @F.pandas_udf(
        "struct<ok: int, page_md5: string, n_chars: bigint, "
        "house_agree: int>"
    )
    def _rt(did: pd.Series, page: pd.Series) -> pd.DataFrame:
        import pyarrow as _pa

        levels = [1, 3, 9, 19]
        codec = _pa.Codec("zstd")
        oks, md5s, ns, agrees = [], [], [], []
        for d, p in zip(did, page):
            d = int(d)
            body = (p if isinstance(p, str) else "").encode("utf-8")
            try:
                comp = zstd_compress(body, levels[d % 4])
                if d % 23 == 1:
                    comp = comp[: max(0, len(comp) - 4)]
                ref = codec.decompress(
                    comp, decompressed_size=len(body), asbytes=True
                )
                if len(ref) != len(body):
                    raise ValueError("reference decode length mismatch")
                text = ref.decode("utf-8")
                oks.append(1)
                md5s.append(hashlib.md5(ref).hexdigest())
                ns.append(len(text))
                try:
                    agrees.append(int(zstd_decompress(comp) == ref))
                except ValueError:
                    agrees.append(0)
            except Exception:
                # truncated-frame class (and any reference-decoder
                # rejection): quarantine visibly, never poison the stage
                oks.append(0)
                md5s.append("")
                ns.append(-1)
                agrees.append(0)
        return pd.DataFrame(
            {"ok": oks, "page_md5": md5s, "n_chars": ns,
             "house_agree": agrees}
        )

    out = df.select(
        F.col(id_col), _rt(F.col(id_col), F.col(page_col)).alias("_d")
    )
    return out.select(
        id_col, "_d.ok", "_d.page_md5", "_d.n_chars", "_d.house_agree"
    )


def warc_zst_house_write(
    df: DataFrame,
    id_col: str = "doc_id",
    page_col: str = "page",
) -> DataFrame:
    """.warc.zst WRITE side (r14 — the archive format newer crawls
    ship, now writable without libzstd): per doc a two-record WARC
    (response carrying the fixture page + a metadata record) is
    compressed FRAME-PER-RECORD by the house RFC 8878 encoder (the
    standard .warc.zst layout — each record its own frame so readers
    can seek by offset), id%5==0 docs prepend a skippable
    dictionary-slot frame, and the blob is read back through the
    PRODUCTION ingest chain (maybe_gunzip_warc -> parse_warc, which
    prefers pyarrow's libzstd streaming decode — the reference
    implementation again the authority on the house encoder's
    output).  Emits (ok, n_records, page_md5, n_chars); id%23==1
    truncates the final frame and must quarantine to the visible
    (0, -1, '', -1) row.  One Arrow kernel over one widened scan,
    shuffle-free; stateless (streams as-is)."""
    import hashlib

    from esgopeta_spark.operators.zstd import zstd_compress

    @F.pandas_udf(
        "struct<ok: int, n_records: int, page_md5: string, "
        "n_chars: bigint>"
    )
    def _rt(did: pd.Series, page: pd.Series) -> pd.DataFrame:
        import struct as _struct

        levels = [1, 3, 9, 19]
        oks, nrecs, md5s, ns = [], [], [], []
        for d, p in zip(did, page):
            d = int(d)
            body = (p if isinstance(p, str) else "").encode("utf-8")
            uri = f"https://corpus.example/doc/{d}"
            recs = [
                build_warc_record(uri, body),
                build_warc_record(uri, b"fetch-meta: ok", rec_type="metadata"),
            ]
            frames = [
                zstd_compress(r, level=levels[d % 4]) for r in recs
            ]
            blob = b"".join(frames)
            if d % 5 == 0:
                blob = (_struct.pack("<II", 0x184D2A50, 4) + b"dict" + blob)
            if d % 23 == 1:
                blob = blob[: max(0, len(blob) - 6)]
            try:
                parsed = parse_warc(maybe_gunzip_warc(blob))
                if len(parsed) != 2:
                    raise ValueError("record count mismatch")
                pay = parsed[0]["payload"]
                text = pay.decode("utf-8")
                oks.append(1)
                nrecs.append(len(parsed))
                md5s.append(hashlib.md5(pay).hexdigest())
                ns.append(len(text))
            except Exception:
                oks.append(0)
                nrecs.append(-1)
                md5s.append("")
                ns.append(-1)
        return pd.DataFrame(
            {"ok": oks, "n_records": nrecs, "page_md5": md5s, "n_chars": ns}
        )

    out = df.select(
        F.col(id_col), _rt(F.col(id_col), F.col(page_col)).alias("_d"))
    return out.select(
        id_col, "_d.ok", "_d.n_records", "_d.page_md5", "_d.n_chars")

