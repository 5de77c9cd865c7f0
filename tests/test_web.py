"""Crawl front-end (operators/web.py): HTML->text extraction and URL
canonicalization.  The graded entries prove the encoder-twin round trip
hash-exact; these tests pin the kernels' GENERAL behavior — adversarial
markup, the entity matrix, the canonicalization matrix, fuzz no-raise
totality, and the batch≡stream contract for the stateless projections.
"""

from __future__ import annotations

import random

import pytest

from esgopeta_spark.operators.web import (
    canonicalize_url,
    decode_entities,
    extract_html_text,
)


# ---------------------------------------------------------------------------
# extractor unit matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "html,want",
    [
        # block segmentation: one line per block element, inline tags fuse
        ("<p>a<b>b</b>c</p><p>d</p>", "abc\nd"),
        ("<h1>Title</h1><div>body <em>em</em> text</div>", "Title\nbody em text"),
        ("line1<br>line2<br/>line3", "line1\nline2\nline3"),
        ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
        ("<table><tr><td>a</td><td>b</td></tr></table>", "a\nb"),
        # raw-text elements: content dropped wholesale, incl. fake markup
        ('<script>var s = "</div><p>x</p>"; if (1 < 2) {}</script>after', "after"),
        ("<style>p > a { color: red }</style>text", "text"),
        ("<textarea><p>not text</p></textarea>kept", "kept"),
        ("<SCRIPT>case insensitive</SCRIPT>ok", "ok"),
        # boilerplate subtrees dropped, nesting respected
        ("<nav>Home | About</nav><p>content</p>", "content"),
        ("<header><nav>double</nav>still header</header><p>x</p>", "x"),
        ("<nav><nav>inner</nav>outer tail</nav><p>y</p>", "y"),
        ("<footer>© 2026</footer><aside>ads</aside>body", "body"),
        # comments / doctype / PI dropped, incl. markup inside comments
        ("<!DOCTYPE html><p>a</p>", "a"),
        ("<!-- <p>not text</p> -->real", "real"),
        ("<?xml version='1.0'?>text", "text"),
        # quoted '>' inside attributes does not end the tag
        ('<div data-x="a > b">inside</div>', "inside"),
        ("<div data-x='1>2' class=\"q\">t</div>", "t"),
        # literal '<' in text survives; unterminated constructs drop tail
        ("5 < 6 is true", "5 < 6 is true"),
        ("<p>kept</p><!-- unterminated", "kept"),
        ("<p>kept</p><script>never closed", "kept"),
        ("<p>kept</p><div unterminated", "kept"),
        # whitespace collapse + empty-line drop
        ("<p>  a \t b \n c  </p><p>   </p><p>d</p>", "a b c\nd"),
        # title is text; head chrome is not
        ('<head><title>T</title><meta charset="x"><link href="y"></head>Z', "T\nZ"),
        # entities in flow text
        ("<p>fish &amp; chips &lt;3</p>", "fish & chips <3"),
        ("<p>&#65;&#x42;c</p>", "ABc"),
        # empty / tagless inputs
        ("", ""),
        ("just text", "just text"),
    ],
)
def test_extract_matrix(html, want):
    assert extract_html_text(html) == want


def test_decode_entities_matrix():
    assert decode_entities("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'"
    assert decode_entities("&nbsp;x") == " x"
    assert decode_entities("&copy; &euro; &mdash;") == "© € —"
    # numeric: decimal, hex, windows-1252 C1 remap
    assert decode_entities("&#8364;") == "€"
    assert decode_entities("&#x20AC;") == "€"
    assert decode_entities("&#150;") == "–"  # 0x96 -> U+2013 via cp1252
    assert decode_entities("&#147;quote&#148;") == "“quote”"
    # invalid -> U+FFFD per HTML5
    assert decode_entities("&#0;&#x110000;&#xD800;") == "���"
    # unknown names and bare '&' stay literal
    assert decode_entities("&bogus; & &noSemicolonEver") == "&bogus; & &noSemicolonEver"
    # no-entity fast path
    assert decode_entities("plain") == "plain"


def test_extract_is_total_fuzz():
    """The extractor is a TOTAL function: any string — random bytes,
    truncated/mutated fixture pages — returns a str, never raises (at
    100 TB a poison page costs its own text, not the stage)."""
    rng = random.Random(0xC0FFEE)
    base = (
        '<html><head><title>T</title><script>x<y</script></head><body>'
        '<nav>n</nav><!-- c --><div a="q>b"><p>body &amp; &#65; text</p>'
        "</div><footer>f</footer></body></html>"
    )
    for trial in range(300):
        kind = trial % 3
        if kind == 0:  # random printable garbage heavy on <>&;="'
            s = "".join(
                rng.choice('<>&;="\'ab c/!?#-\n\t%') for _ in range(rng.randrange(0, 120))
            )
        elif kind == 1:  # truncate the fixture anywhere
            s = base[: rng.randrange(0, len(base))]
        else:  # random single-char mutations
            b = list(base)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.choice('<>&;="\'\x00\xff')
            s = "".join(b)
        out = extract_html_text(s)
        assert isinstance(out, str)
        assert "\n\n" not in out  # no empty lines ever
    # random raw bytes decoded permissively
    for _ in range(100):
        raw = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        assert isinstance(extract_html_text(raw.decode("latin-1")), str)


# ---------------------------------------------------------------------------
# canonicalization matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "url,want",
    [
        # case, default port, fragment
        ("HTTP://Example.COM/Path", "http://example.com/Path"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("https://example.com/x#frag", "https://example.com/x"),
        ("https://example.com.:443/x#a#b", "https://example.com/x"),
        # empty path -> '/'
        ("https://example.com", "https://example.com/"),
        ("https://example.com?a=1", "https://example.com/?a=1"),
        # tracking params out, order sorted, empty segments dropped
        (
            "https://e.com/p?utm_source=x&b=2&utm_campaign=y&a=1",
            "https://e.com/p?a=1&b=2",
        ),
        ("https://e.com/p?fbclid=123&gclid=9", "https://e.com/p"),
        ("https://e.com/p?b=2&&a=1&", "https://e.com/p?a=1&b=2"),
        ("https://e.com/p?", "https://e.com/p"),
        # valueless keys keep their form; '=' presence is significant
        ("https://e.com/p?flag&a=", "https://e.com/p?a=&flag"),
        # percent normalization: unreserved decodes, others uppercase hex
        ("https://e.com/%61%2Fb", "https://e.com/a%2Fb"),
        ("https://e.com/a%2fb?k=%7e%41", "https://e.com/a%2Fb?k=~A"),
        ("https://e.com/%zz", "https://e.com/%zz"),  # bad escape stays
        # non-URL strings pass through trimmed, never raise
        ("not a url", "not a url"),
        ("  spaced  ", "spaced"),
        ("", ""),
        ("mailto:x@y.com", "mailto:x@y.com"),
    ],
)
def test_canonicalize_matrix(url, want):
    assert canonicalize_url(url) == want


def test_canonicalize_idempotent_fuzz():
    """canonicalize(canonicalize(u)) == canonicalize(u) — a canonical
    form that isn't a fixed point silently splits dedup groups."""
    rng = random.Random(0xBEEF)
    pieces = ["https://", "HTTP://", "Ex.COM", ":443", ":80", ":8080", "/a/B",
              "/%61", "%2f", "?a=1", "&utm_source=x", "&b=%7E", "#f", "&", "?",
              "."]
    for _ in range(300):
        u = "".join(rng.choice(pieces) for _ in range(rng.randrange(1, 8)))
        c = canonicalize_url(u)
        assert canonicalize_url(c) == c, u


def test_extract_html_blocks_anchor_tracking():
    """The block walker's per-line anchor text drives the jusText link
    density: fully-anchored lines score ~1000 milli, anchor-free lines
    0, mixed lines the exact char ratio; anchors never leak across
    block boundaries; nested/unbalanced anchors clamp."""
    from esgopeta_spark.operators.web import extract_html_blocks

    blocks = extract_html_blocks(
        '<p>plain words only</p>'
        '<p><a href="/1">quick link</a> <a href="/2">another link</a></p>'
        '<p>see <a href="/r">ref 7</a> for details</p>'
        '<p><a href="/x">dangling anchor<p>next block clean</p>'
        '<p><a><a>double</a>still anchored</a>out</p>'
    )
    texts = [t for t, _ in blocks]
    assert texts == [
        "plain words only",
        "quick link another link",
        "see ref 7 for details",
        "dangling anchor",
        "next block clean",
        "doublestill anchoredout",
    ]
    atexts = [a for _, a in blocks]
    assert atexts[0] == ""
    assert atexts[1] == "quick linkanother link"  # fragments concatenate
    assert atexts[2] == "ref 7"
    assert atexts[3] == "dangling anchor"
    assert atexts[4] == ""  # block boundary closed the dangling anchor
    assert atexts[5] == "doublestill anchored"  # unbalanced </a> clamps
    # extract_html_text is exactly the block texts joined
    from esgopeta_spark.operators.web import extract_html_text

    assert extract_html_text("<p>a</p><p>b</p>") == "a\nb"


def test_extract_pathological_inputs_stay_linear():
    """The walker's scans are all forward-moving — megabyte-scale
    pathological pages (tag soup, lone '<'s, entity storms, unclosed
    comments) must complete in linear-ish time.  This pin exists so a
    future 'small fix' cannot quietly reintroduce an O(n^2) rescan: at
    100 TB a quadratic extractor is a dead stage, not a slow one."""
    import time

    from esgopeta_spark.operators.web import extract_html_text

    cases = [
        "<" * 1_000_000,
        "<a " * 300_000,
        "&amp;" * 200_000,
        "&nosemi" * 150_000,
        "<p>x</p>" * 150_000,
        "<!--" + "y" * 1_000_000,
        "<div " + "a='b' " * 150_000 + ">t</div>",
    ]
    t0 = time.perf_counter()
    for s in cases:
        out = extract_html_text(s)
        assert isinstance(out, str)
    took = time.perf_counter() - t0
    assert took < 20.0, f"pathological extraction took {took:.1f}s"


# ---------------------------------------------------------------------------
# link extraction + RFC 3986 resolution
# ---------------------------------------------------------------------------


def test_extract_links_matrix():
    from esgopeta_spark.operators.web import extract_links

    html = (
        '<nav><a href="/">Home</a><a href = "/about?a=1&amp;b=2">A</a></nav>'
        "<p><a href='../up/x.html'>rel</a> <a href=bare.html>b</a> "
        '<a data-x="no">no href</a> <a href="//cdn.ex.com/z">proto</a> '
        '<a href="?p=2">q</a> <abbr>not-an-anchor</abbr>'
        '<article href="/nope">not either</article></p>'
    )
    # entity references in attributes decode; non-<a> tags ignored;
    # href-less anchors skipped; document order, duplicates kept
    assert extract_links(html) == [
        "/", "/about?a=1&b=2", "../up/x.html", "bare.html", "//cdn.ex.com/z", "?p=2"
    ]
    assert extract_links("") == []
    assert extract_links("<a href='unterminated") == []
    assert extract_links('<a href="x">1</a><a href="x">2</a>') == ["x", "x"]


@pytest.mark.parametrize(
    "href,want",
    [
        ("https://other.com/abs", "https://other.com/abs"),
        ("//cdn.ex.com/z", "https://cdn.ex.com/z"),
        ("/top/x", "https://h.com/top/x"),
        ("../up.html", "https://h.com/a/up.html"),
        ("./same.html", "https://h.com/a/b/same.html"),
        ("plain.html", "https://h.com/a/b/plain.html"),
        ("a/../../../x", "https://h.com/x"),  # over-popping clamps at root
        ("?p=9", "https://h.com/a/b/c?p=9"),
        ("#frag", "https://h.com/a/b/c?q=1#frag"),
        ("", "https://h.com/a/b/c?q=1"),
        ("mailto:x@y.z", "mailto:x@y.z"),
    ],
)
def test_resolve_url_matrix(href, want):
    from esgopeta_spark.operators.web import resolve_url

    assert resolve_url("https://h.com/a/b/c?q=1", href) == want


def test_resolve_url_total():
    from esgopeta_spark.operators.web import resolve_url

    assert resolve_url("not a base", "/x") == "/x"  # unparseable base
    assert resolve_url("https://h.com", "x") == "https://h.com/x"


# ---------------------------------------------------------------------------
# WARC framing
# ---------------------------------------------------------------------------


def test_warc_roundtrip_binary_safe():
    """Payload bytes are framed by declared Content-Length, never
    scanned — a payload containing the record separator must survive."""
    from esgopeta_spark.operators.web import build_warc_record, parse_warc

    evil = b"hello\r\n\r\nWARC/1.0\r\n\r\nworld" + bytes(range(256))
    blob = (
        build_warc_record("https://x.com/1", evil)
        + build_warc_record("https://x.com/2", b"", rec_type="resource")
    )
    recs = parse_warc(blob)
    assert [r["uri"] for r in recs] == ["https://x.com/1", "https://x.com/2"]
    assert recs[0]["payload"] == evil
    assert recs[1]["type"] == "resource" and recs[1]["length"] == 0


def test_robots_rfc9309_matrix():
    """RFC 9309 semantics: agent-group selection (longest match, '*'
    fallback, multi-agent groups), longest-pattern precedence with
    Allow winning ties, '*'/'$' patterns, comments, empty Disallow,
    unknown directives ignored."""
    from esgopeta_spark.operators.web import parse_robots, robots_allows

    txt = (
        "# comment\n"
        "User-agent: megabot\n"
        "User-agent: esgopeta\n"
        "Disallow: /private/\n"
        "Allow: /private/pub\n"
        "Crawl-delay: 10\n"  # unknown directive: ignored
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    rules = parse_robots(txt)
    # multi-agent group: both agents got both rules
    assert ("megabot", "disallow", "/private/") in rules
    assert ("esgopeta", "allow", "/private/pub") in rules
    # our group: /private/ blocked, /private/pub allowed (longer Allow)
    assert not robots_allows(rules, "esgopeta", "/private/x")
    assert robots_allows(rules, "esgopeta", "/private/pub1")
    assert robots_allows(rules, "esgopeta", "/open")
    # other agents fall through to the '*' group: everything blocked
    assert not robots_allows(rules, "randombot", "/open")
    # agent token is a substring match of the product token
    assert not robots_allows(rules, "esgopeta/2.0 (+https://x)", "/private/x")

    wild = parse_robots("User-agent: *\nDisallow: /a/*7$\nAllow: /a/17$\n")
    assert not robots_allows(wild, "any", "/a/27")
    assert robots_allows(wild, "any", "/a/17")  # equal length -> Allow wins
    assert robots_allows(wild, "any", "/a/271")  # '$' anchors
    assert robots_allows(wild, "any", "/b/7")
    # empty Disallow allows everything; empty rules allow everything
    assert robots_allows(parse_robots("User-agent: *\nDisallow:\n"), "x", "/any")
    assert robots_allows(parse_robots(""), "x", "/any")
    # Allow/Disallow of equal length: Allow wins
    tie = parse_robots("User-agent: *\nDisallow: /abc\nAllow: /ab*\n")
    assert robots_allows(tie, "x", "/abc")


def test_sniff_payload_routes_on_bytes():
    import numpy as np

    from esgopeta_spark.operators import codecs
    from esgopeta_spark.operators.web import sniff_payload

    assert sniff_payload(b"<!DOCTYPE html><html>x</html>") == "html"
    assert sniff_payload(b"  \n<html><body>y") == "html"
    assert sniff_payload(b"<?xml version='1.0'?><feed/>") == "html"
    assert sniff_payload(codecs.encode_png(np.zeros((2, 2), np.uint8))) == "png"
    assert sniff_payload(
        codecs.encode_wav(np.zeros(16, np.int16), 8000)
    ) == "wav"
    assert sniff_payload(b"just plain text") == "unknown"
    assert sniff_payload(b"") == "empty"


def test_parse_http_response_matrix():
    """WARC response payloads are full HTTP messages: status + headers
    split off, chunked bodies de-chunked, bare-LF header endings
    tolerated, non-HTTP payloads passed through as bare bodies."""
    import pytest as _pytest

    from esgopeta_spark.operators.web import parse_http_response

    st, hdrs, body = parse_http_response(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"X-Thing: a:b\r\n\r\n<html>x</html>"
    )
    assert st == 200 and body == b"<html>x</html>"
    assert hdrs["content-type"] == "text/html; charset=utf-8"
    assert hdrs["x-thing"] == "a:b"  # header values keep their colons
    # bare-LF endings (old crawls)
    st, _h, body = parse_http_response(b"HTTP/1.0 404 Not Found\nA: b\n\nmissing")
    assert st == 404 and body == b"missing"
    # chunked transfer-encoding de-chunks (sizes hex, extensions ignored)
    st, _h, body = parse_http_response(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"4\r\nWiki\r\n5;ext=1\r\npedia\r\n0\r\n\r\n"
    )
    assert st == 200 and body == b"Wikipedia"
    # bare bodies pass through untouched
    assert parse_http_response(b"<html>bare</html>") == (0, {}, b"<html>bare</html>")
    assert parse_http_response(b"") == (0, {}, b"")
    # malformed status line: treated as bare bytes, not an error
    raw = b"HTTP/1.1 xx\r\n\r\nz"
    assert parse_http_response(raw) == (0, {}, raw)
    # malformed chunk framing quarantines
    with _pytest.raises(ValueError):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nx"
        )
    with _pytest.raises(ValueError):
        parse_http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nshort"
        )


def test_warc_route_quarantines_poison_payload(spark):
    """A PNG payload with a flipped byte must cost ONE error row, not
    the stage; well-formed records around it still route."""
    import numpy as np

    from pyspark.sql import functions as F

    from esgopeta_spark.operators import codecs
    from esgopeta_spark.operators.web import build_warc_record, warc_route

    png = codecs.encode_png(np.full((3, 4), 7, np.uint8))
    poison = png[:20] + bytes([png[20] ^ 0xFF]) + png[21:]  # corrupt IHDR crc
    blob = (
        build_warc_record("u1", b"<html><p>eight words of clean body text here</p>")
        + build_warc_record("u2", poison)
        + build_warc_record("u3", png)
    )
    df = spark.createDataFrame([(1, blob)], "doc_id: long, warc: binary")
    rows = {r["uri"]: (r["kind"], r["stat"]) for r in warc_route(df).collect()}
    assert rows["u1"][0] == "html" and rows["u1"][1] > 0
    assert rows["u2"] == ("error", -1)
    assert rows["u3"] == ("png", 12)


def test_gzip_members_and_transparent_parse():
    """.warc.gz layout: one gzip member per record; gzip_members splits
    concatenated members, the parsers auto-detect the magic, offsets
    index the decompressed stream; truncated/garbage members raise."""
    import pytest as _pytest

    from esgopeta_spark.operators.web import (
        build_warc_record,
        gzip_members,
        gzip_record,
        maybe_gunzip_warc,
        parse_warc,
    )

    r1 = build_warc_record("https://x.com/1", b"abc")
    r2 = build_warc_record("https://x.com/2", bytes(range(64)))
    gz = gzip_record(r1) + gzip_record(r2)
    assert gzip_members(gz) == [r1, r2]
    assert maybe_gunzip_warc(gz) == r1 + r2
    assert maybe_gunzip_warc(r1) == r1  # plain bytes pass through
    recs = parse_warc(maybe_gunzip_warc(gz))
    assert [r["uri"] for r in recs] == ["https://x.com/1", "https://x.com/2"]
    assert recs[0]["offset"] == 0 and recs[1]["offset"] == recs[0]["reclen"]
    assert recs[1]["offset"] + recs[1]["reclen"] == len(r1 + r2)
    # deterministic compression (mtime pinned)
    assert gzip_record(r1) == gzip_record(r1)
    with _pytest.raises(ValueError):
        gzip_members(gz[: len(gzip_record(r1)) + 5])
    with _pytest.raises(ValueError):
        gzip_members(b"\x1f\x8bgarbage")


def test_surt_key_matrix():
    from esgopeta_spark.operators.web import surt_key

    assert surt_key("https://site7.example.com/articles/1?page=2") == (
        "com,example,site7)/articles/1?page=2"
    )
    # canonicalization composes: case/port/fragment/tracking collapse first
    assert surt_key("HTTPS://WWW.Ex.COM:443/A/b#f?x") == "com,ex,www)/A/b"
    assert surt_key("http://h.com") == "com,h)/"
    assert surt_key("not a url") == "not a url"


def test_charset_of_and_route_decode():
    from esgopeta_spark.operators.web import charset_of, parse_http_response

    assert charset_of({"content-type": "text/html; charset=ISO-8859-1"}) == "iso-8859-1"
    assert charset_of({"content-type": "text/html"}) == "utf-8"
    assert charset_of({}) == "utf-8"
    # a latin-1 page unwraps and decodes per its declared charset
    body = "<p>café</p>".encode("latin-1")
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=latin-1\r\n\r\n" + body
    )
    st, hdrs, got = parse_http_response(payload)
    assert st == 200 and got == body
    assert got.decode(charset_of(hdrs)) == "<p>café</p>"


def test_warc_malformed_quarantines():
    import pytest as _pytest

    from esgopeta_spark.operators.web import build_warc_record, parse_warc

    good = build_warc_record("https://x.com/1", b"abc")
    for bad in [
        b"NOPE",                                  # no magic
        good[:20],                                # unterminated header
        good[:-2],                                # missing terminator
        good.replace(b"Content-Length: 3", b"Content-Length: zz"),
        good.replace(b"Content-Length: 3", b"Content-Length: 99"),
        good.replace(b"WARC/1.0", b"WARC/9.9"),
    ]:
        with _pytest.raises(ValueError):
            parse_warc(bad)


# ---------------------------------------------------------------------------
# batch ≡ stream (stateless projections shared, not mirrored)
# ---------------------------------------------------------------------------


def test_html_extract_stream_twin(spark, tmp_path):
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.web import html_extract, synth_html

    docs = [(i, f"doc {i} body text with <angles> & amp") for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id: long, text: string").select(
        "doc_id", synth_html(F.col("doc_id"), F.col("text")).alias("html")
    )
    want = {(r["doc_id"], r["clean_text"], r["n_lines"]) for r in html_extract(df).collect()}

    df.coalesce(1).write.mode("overwrite").json(str(tmp_path / "html_in"))
    stream = spark.readStream.schema("doc_id long, html string").json(
        str(tmp_path / "html_in")
    )
    q = (
        html_extract(stream)
        .writeStream.format("memory")
        .queryName("htmlstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r["doc_id"], r["clean_text"], r["n_lines"])
        for r in spark.sql("SELECT * FROM htmlstream").collect()
    }
    assert got == want


def test_warc_route_stream_twin(spark, tmp_path):
    """End-to-end streaming crawl ingestion: WARC blobs arrive on a
    stream, records are parsed, payloads sniffed and routed to the
    decoders — the whole chain is stateless Arrow kernels, so the
    stream shares the batch projection and must emit identical rows."""
    import numpy as np

    from pyspark.sql import functions as F

    from esgopeta_spark.operators import codecs
    from esgopeta_spark.operators.web import build_warc_record, warc_route

    rows = []
    for i in range(12):
        if i % 3 == 0:
            payload = f"<html><body><p>doc {i} body text</p></body></html>".encode()
        elif i % 3 == 1:
            payload = codecs.encode_png(np.full((2, 3), i % 256, np.uint8))
        else:
            payload = codecs.encode_wav(np.zeros(64 + i, np.int16), 8000)
        rows.append((i, build_warc_record(f"https://h{i}.com/", payload)))
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    want = {tuple(r) for r in warc_route(df).collect()}
    assert {r[2] for r in want} == {"html", "png", "wav"}

    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "warc_in"))
    stream = spark.readStream.schema("doc_id long, warc binary").parquet(
        str(tmp_path / "warc_in")
    )
    q = (
        warc_route(stream)
        .writeStream.format("memory")
        .queryName("warcstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM warcstream").collect()}
    assert got == want


def test_streaming_url_dedup_first_wins(spark, tmp_path):
    """Ingest-time URL-level dedup: canonicalize on the stream (shared
    stateless kernel) then dropDuplicates on the canonical key — the
    first syntactic variant of each resource survives, later refetches
    of the same resource drop, across micro-batches."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.web import synth_url_variants, url_canonicalize

    b0 = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.element_at(synth_url_variants(F.col("id")), 1).alias("url"),
    )
    # batch 1: DIFFERENT variants of the same 10 resources + 5 new ones
    b1 = spark.range(15).select(
        (F.col("id") + 100).alias("doc_id"),
        F.element_at(synth_url_variants(F.col("id")), 2).alias("url"),
    )
    (b0.coalesce(1).write.mode("overwrite").json(str(tmp_path / "ud") + "/b0"))
    (b1.coalesce(1).write.mode("overwrite").json(str(tmp_path / "ud") + "/b1"))
    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "ud") + "/*")
    )
    q = (
        url_canonicalize(stream)
        .dropDuplicates(["url_canon"])
        .writeStream.format("memory")
        .queryName("urldedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    rows = spark.sql("SELECT doc_id, url_canon FROM urldedup").collect()
    assert len(rows) == 15  # 10 resources + 5 genuinely new
    # the 10 shared resources kept their FIRST (batch-0) fetcher id
    by_canon = {r["url_canon"]: r["doc_id"] for r in rows}
    assert sum(1 for v in by_canon.values() if v < 100) == 10
    assert sum(1 for v in by_canon.values() if v >= 100) == 5


def test_streaming_crawl_chain_matches_batch(spark, tmp_path):
    """The FULL crawl chain on a stream: WARC blobs -> warc_html_text
    (stateless fused kernel) -> length gate -> the streaming split/
    shard twin.  Per-doc (split, shard) assignments must equal the
    batch pipeline's for the gated html docs, with records arriving
    over two micro-batches."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.text import split_shards
    from esgopeta_spark.operators.web import (
        build_warc_record,
        warc_html_text,
    )
    from esgopeta_spark.streaming.prep import streaming_split_shards

    def blob(i):
        if i % 3 == 0:
            body = (
                f"<html><body><p>document {i} carries a long enough body "
                f"paragraph to clear the gate threshold</p></body></html>"
            ).encode()
        else:
            body = b"\x89PNG\r\n\x1a\nnot really"  # non-html: dropped
        return (i, build_warc_record(f"https://h{i}.com/", body))

    rows = [blob(i) for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    batch_gated = (
        warc_html_text(df)
        .filter(F.length("clean_text") >= 40)
        .select("doc_id")
    )
    want = {
        (r["doc_id"], r["split"], r["shard"])
        for r in split_shards(batch_gated).collect()
    }
    assert want and len(want) == 8  # the id%3==0 docs

    (spark.createDataFrame(rows[:12], "doc_id: long, warc: binary")
     .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "cc") + "/b0"))
    (spark.createDataFrame(rows[12:], "doc_id: long, warc: binary")
     .coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "cc") + "/b1"))
    stream = (
        spark.readStream.schema("doc_id long, warc binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "cc") + "/*")
    )
    gated = (
        warc_html_text(stream)
        .filter(F.length("clean_text") >= 40)
        .select("doc_id")
    )
    q = (
        streaming_split_shards(gated)
        .writeStream.format("memory")
        .queryName("crawlchain")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {
        (r["doc_id"], r["split"], r["shard"])
        for r in spark.sql(
            "SELECT doc_id, split, shard FROM crawlchain"
        ).collect()
    }
    assert got == want


def test_url_canonicalize_stream_twin(spark, tmp_path):
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.web import synth_url_variants, url_canonicalize

    df = spark.range(15).select(
        F.col("id").alias("doc_id"),
        F.explode(synth_url_variants(F.col("id"))).alias("url"),
    )
    want = {(r["url"], r["url_canon"]) for r in url_canonicalize(df).collect()}
    # every doc's five variants collapse to ONE canonical form
    by_doc = {}
    for u, c in want:
        by_doc.setdefault(c, set()).add(u)
    assert all(len(v) == 5 for v in by_doc.values())

    df.coalesce(1).write.mode("overwrite").json(str(tmp_path / "url_in"))
    stream = spark.readStream.schema("doc_id long, url string").json(
        str(tmp_path / "url_in")
    )
    q = (
        url_canonicalize(stream)
        .select("url", "url_canon")
        .writeStream.format("memory")
        .queryName("urlstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r["url"], r["url_canon"])
        for r in spark.sql("SELECT * FROM urlstream").collect()
    }
    assert got == want


def test_parse_sitemap_matrix():
    """sitemaps.org parsing: urlset/sitemapindex blocks, entity-decoded
    trimmed locs, lastmod date prefix, digit-wise priority milli,
    protocol defaults, loc-less entries dropped."""
    from esgopeta_spark.operators.web import _priority_milli, parse_sitemap

    got = parse_sitemap(
        '<?xml version="1.0"?><urlset xmlns="x">\n'
        "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>"
        "<lastmod>2024-03-09T12:00:00+00:00</lastmod>"
        "<priority>0.8</priority></url>\n"
        "<URL><LOC>https://b.com/</LOC></URL>\n"
        "<url><lastmod>2024-01-01</lastmod></url>\n"  # no loc -> dropped
        "<url><loc></loc></url></urlset>"  # empty loc -> dropped
    )
    assert got == [
        ("url", "https://a.com/p?x=1&y=2", "2024-03-09", 800),
        ("url", "https://b.com/", "", 500),
    ]
    assert parse_sitemap(
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "<lastmod>bogus</lastmod></sitemap></sitemapindex>"
    ) == [("sitemap", "https://a.com/s1.xml", "", 500)]
    # priority: digit-wise (never through a float), clamped, defaulted
    assert _priority_milli("0.8") == 800
    assert _priority_milli("0.123456") == 123
    assert _priority_milli("1.0") == 1000
    assert _priority_milli("7") == 1000
    assert _priority_milli("") == 500
    assert _priority_milli("high") == 500


def test_parse_sitemap_total_fuzz():
    """parse_sitemap is TOTAL: random garbage, truncations, and
    mutations of a valid sitemap return a list, never raise."""
    import random

    from esgopeta_spark.operators.web import parse_sitemap

    rng = random.Random(0x51733)
    base = (
        '<urlset><url><loc>https://a.com/?q=1&amp;r=2</loc>'
        "<lastmod>2024-05-06</lastmod><priority>0.5</priority></url>"
        "<url><loc>https://b.com/x</loc></url></urlset>"
    )
    for trial in range(300):
        kind = trial % 3
        if kind == 0:
            s = "".join(
                rng.choice('<>&;="\'ab c/!?#-\n\t%') for _ in range(rng.randrange(0, 120))
            )
        elif kind == 1:
            s = base[: rng.randrange(0, len(base))]
        else:
            b = list(base)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.choice('<>&;x "')
            s = "".join(b)
        out = parse_sitemap(s)
        assert isinstance(out, list)
        for kind_, loc, lastmod, pri in out:
            assert kind_ in ("url", "sitemap") and isinstance(loc, str)
            assert isinstance(lastmod, str) and 0 <= pri <= 1000


def test_crawl_frontier_chain_semantics(spark, sf_dir):
    """The fused frontier entry's gate logic end-to-end on real parsed
    urls: /articles/ ids ending in 7 blocked on even hosts, ALL
    /articles/ blocked for this agent on odd hosts, /a/ passes both;
    every url canonical (lowercase scheme/host, :443 stripped, entity
    decoded); waves pack 4 slots per host."""
    from esgopeta_spark.plans import REGISTRY

    rows = REGISTRY["pipeline_crawl_frontier"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        url, did = r["url_canon"], r["doc_id"]
        h = did % 40
        assert url.startswith("https://site") and ":443" not in url
        assert "&amp;" not in url and "EXAMPLE" not in url
        if "/articles/" in url:
            assert h % 2 == 0 and did % 10 != 7, r
        else:
            assert f"/a/{did}" in url, r
        assert 0 <= r["slot"] < 4
    # wave packing: per host, slot counts fill 4 before a new wave opens
    per_host: dict = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append((r["fetch_wave"], r["slot"]))
    for host, ws in per_host.items():
        n = len(ws)
        assert sorted(ws) == [(i // 4, i % 4) for i in range(n)], host


def test_sitemap_entries_stream_twin(spark, tmp_path):
    """sitemap_entries is a stateless Arrow kernel, so the stream twin
    IS the batch operator on a streaming frame — parsed entry arrays
    bit-equal to batch over multi-file arrival."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.web import sitemap_entries, synth_sitemap

    d = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), synth_sitemap(F.col("id")).alias("sitemap_xml")
    )
    want = {r["doc_id"]: r["entries"] for r in sitemap_entries(d).collect()}
    d.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "sm"))
    stream = spark.readStream.schema("doc_id long, sitemap_xml string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(tmp_path / "sm"))
    q = (
        sitemap_entries(stream)
        .writeStream.format("memory")
        .queryName("smstream")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["doc_id"]: r["entries"]
        for r in spark.sql("SELECT * FROM smstream").collect()
    }
    assert got == want


def test_extract_anchors_matrix():
    """Anchor scanner: href multiplicity IDENTICAL to extract_links
    (same scanner — pinned), inner text tag-stripped (quote-aware),
    entity-decoded, whitespace-collapsed; unterminated anchors keep the
    edge with '' text; nested anchors auto-close at the first </a>."""
    from esgopeta_spark.operators.web import extract_anchors, extract_links

    h = (
        '<p><a href="/x?a=1&amp;b=2">Topic <b>7</b>\n q&amp;a</a>'
        "<a href='y'>t</a><a href=z>open"
    )
    got = extract_anchors(h)
    assert got == [("/x?a=1&b=2", "Topic 7 q&a"), ("y", "t"), ("z", "")]
    assert [a for a, _ in got] == extract_links(h)
    assert extract_anchors('<a href="/o"> nest <a href="/i">in</a> tail </a>') == [
        ("/o", "nest in"),
        ("/i", "in"),
    ]
    # tags with quoted '>' inside the inner markup don't split the text
    assert extract_anchors('<a href="/q"><img alt="x>y">see</a>') == [("/q", "see")]
    # <abbr>/<article> are not anchors
    assert extract_anchors("<abbr>x</abbr><article>y</article>") == []


def test_extract_anchors_close_not_truncated_by_abbr():
    """r10 ADVICE #1: the close scan must not accept </abbr>, </aside>,
    </article>, ... as the anchor terminator — the char after '</a'
    continuing a tag name means it is some OTHER element's close."""
    from esgopeta_spark.operators.web import extract_anchors

    h = '<a href="/x">see <abbr title="q">IBM</abbr> history</a>'
    assert extract_anchors(h) == [("/x", "see IBM history")]
    h2 = '<a href="/y">in an <aside>note</aside> and <article>body</article> end</a>'
    assert extract_anchors(h2) == [("/y", "in an note and body end")]
    # a genuinely unterminated anchor still yields '' even when a
    # non-anchor </a-prefixed close follows
    assert extract_anchors('<a href="/z">tail <abbr>x</abbr>') == [("/z", "")]


def test_extract_anchors_total_fuzz():
    """extract_anchors is TOTAL and href-consistent with extract_links
    on garbage, truncations, and mutations."""
    import random

    from esgopeta_spark.operators.web import extract_anchors, extract_links

    rng = random.Random(0xA4C402)
    base = (
        '<div><a href="/top/t3">Topic <b>3</b> q&amp;a</a>'
        '<a href="../other/5.html">  other\n 5 </a></div>'
    )
    for trial in range(300):
        kind = trial % 3
        if kind == 0:
            s = "".join(
                rng.choice('<>&;="\'ab c/!?#-\n\t%') for _ in range(rng.randrange(0, 120))
            )
        elif kind == 1:
            s = base[: rng.randrange(0, len(base))]
        else:
            b = list(base)
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] = rng.choice('<>&;x "')
            s = "".join(b)
        got = extract_anchors(s)
        assert [a for a, _ in got] == extract_links(s)
        for href, text in got:
            assert isinstance(href, str) and isinstance(text, str)
            assert "\n" not in text and "  " not in text


def test_extract_image_refs_matrix_and_fuzz():
    """<img> scanner: quote-aware attrs, entity-decoded src, collapsed
    alt, srcless/empty-src tags skipped, altless tags keep '' — and
    total on garbage/truncations."""
    import random

    from esgopeta_spark.operators.web import extract_image_refs

    h = (
        '<img src="/a.png?x=1&amp;y=2" alt="A  red\n fox">'
        '<img alt=noquote src=b.jpg><img src=""><img alt="only alt">'
        '<IMG SRC="/c.gif"><img data-x="y>z" src="/d.png" alt=\'q&amp;a\'>'
    )
    assert extract_image_refs(h) == [
        ("/a.png?x=1&y=2", "A red fox"),
        ("b.jpg", "noquote"),
        ("/c.gif", ""),
        ("/d.png", "q&a"),
    ]
    rng = random.Random(0x1A60)
    for trial in range(200):
        if trial % 2 == 0:
            s = "".join(
                rng.choice('<>&;="\'img src alt/\n\t') for _ in range(rng.randrange(0, 100))
            )
        else:
            s = h[: rng.randrange(0, len(h))]
        for src, alt in extract_image_refs(s):
            assert isinstance(src, str) and src != ""
            assert isinstance(alt, str) and "\n" not in alt


def test_caption_media_pairs_quarantine_and_join(spark):
    """Poison records (truncated PNG, garbage blob) cost themselves,
    never the stage; surviving html+image records pair on the canonical
    url with real decoded stats."""
    import numpy as np
    from pyspark.sql import functions as F

    from esgopeta_spark.operators import codecs
    from esgopeta_spark.operators.web import build_warc_record, caption_media_pairs

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    png = codecs.encode_png(img)
    html = (
        b'<!DOCTYPE html><img src="/i/1.png" alt="a tiny ramp">'
        b'<img src="/i/2.png" alt="no image record">'
    )
    good = build_warc_record("https://h.example.com/page", html) + build_warc_record(
        "https://h.example.com/i/1.png", png
    )
    poison = build_warc_record("https://h.example.com/i/1.png", png[:20])
    rows = caption_media_pairs(
        spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(poison)), (3, bytearray(b"junk"))],
            "doc_id bigint, warc binary",
        )
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["img_url"] == "https://h.example.com/i/1.png"
    assert r["alt"] == "a tiny ramp"
    assert (r["width"], r["height"]) == (4, 3)
    assert r["px_sum"] == int(img.sum())


def test_warc_redirect_edges_matrix(spark):
    """3xx records yield resolved+canonicalized (src, dst) edges;
    non-3xx and Location-less records drop; relative and
    uppercase-host Location forms normalize."""
    from esgopeta_spark.operators.web import build_warc_record, warc_redirect_edges

    def http(status, loc=None):
        h = f"HTTP/1.1 {status} X\r\n"
        if loc is not None:
            h += f"Location: {loc}\r\n"
        return (h + "\r\n").encode()

    rows = [
        (1, build_warc_record("https://a.com/x/1", http(301, "/y/2"))),
        (2, build_warc_record("https://a.com/x/1", http(302, "next"))),
        (3, build_warc_record("https://a.com/x/1", http(307, "HTTPS://B.COM:443/z"))),
        (4, build_warc_record("https://a.com/x/1", http(200))),
        (5, build_warc_record("https://a.com/x/1", http(301))),  # no Location
        (6, build_warc_record("https://a.com/x/1", b"bare body, not http")),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    got = {r["doc_id"]: (r["src_url"], r["dst_url"], r["status"])
           for r in warc_redirect_edges(df).collect()}
    assert got == {
        1: ("https://a.com/x/1", "https://a.com/y/2", 301),
        2: ("https://a.com/x/1", "https://a.com/x/next", 302),
        3: ("https://a.com/x/1", "https://b.com/z", 307),
    }


def test_collapse_redirects_chains_cycles_and_cap(spark):
    """Pointer doubling resolves every suffix of an 8-hop chain (the
    cap); a 9-hop head, a 2-cycle, and a self-loop emit visible marker
    rows; duplicate src edges resolve via min(dst)."""
    from esgopeta_spark.operators.web import collapse_redirects

    edges = [(f"u{i}", f"u{i+1}") for i in range(9)]  # u0..u8 -> 9 hops
    edges += [("c0", "c1"), ("c1", "c0"), ("self", "self")]
    edges += [("dup", "zz"), ("dup", "aa")]  # min -> aa
    df = spark.createDataFrame(edges, "src_url: string, dst_url: string")
    got = {r["src_url"]: (r["final_url"], r["hops"], r["resolved"])
           for r in collapse_redirects(df, max_hops=8).collect()}
    assert got["u0"] == ("", -1, 0)  # 9 hops > cap: marker, not a drop
    for i in range(1, 9):
        assert got[f"u{i}"] == ("u9", 9 - i, 1)
    assert got["c0"] == ("", -1, 0) and got["c1"] == ("", -1, 0)
    assert got["self"] == ("", -1, 0)
    assert got["dup"] == ("aa", 1, 1)
    assert len(got) == 13


def test_warc_redirect_edges_stream_twin(spark, tmp_path):
    """Edge extraction is stateless — the batch projection runs on a
    stream AS-IS (share, don't mirror)."""
    from esgopeta_spark.operators.web import (
        build_warc_record,
        warc_redirect_edges,
    )

    rows = [
        (i, build_warc_record(
            f"https://h{i}.com/p", f"HTTP/1.1 301 M\r\nLocation: /q{i}\r\n\r\n".encode()
        ))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    want = {tuple(r) for r in warc_redirect_edges(df).collect()}
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "redir"))
    stream = spark.readStream.schema("doc_id long, warc binary").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(tmp_path / "redir"))
    q = (
        warc_redirect_edges(stream)
        .writeStream.format("memory")
        .queryName("redirstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM redirstream").collect()}
    assert got == want and len(got) == 6


def test_crawl_delay_matrix():
    """Crawl-delay: agent-group choice mirrors robots_allows (longest
    matching agent, '*' fallback), digit-wise fractional parse, absent/
    malformed -> default, and delay rows never leak into allow/disallow
    verdicts."""
    from esgopeta_spark.operators.web import (
        crawl_delay_milli,
        parse_robots,
        robots_allows,
    )

    txt = (
        "User-agent: *\nCrawl-delay: 10\nDisallow: /private/\n\n"
        "User-agent: esgopeta\nCrawl-delay: 0.5\nDisallow: /slow/\n"
    )
    rules = parse_robots(txt)
    assert crawl_delay_milli(rules, "esgopeta-bot/1.0") == 500
    assert crawl_delay_milli(rules, "otherbot") == 10_000
    # digit-wise: 0.5 -> exactly 500, 1.25 -> 1250, over-precision trims
    r2 = parse_robots("User-agent: *\nCrawl-delay: 1.2509\n")
    assert crawl_delay_milli(r2, "any") == 1250
    # absent / malformed -> default
    assert crawl_delay_milli(parse_robots("User-agent: *\nDisallow:\n"), "x", 7) == 7
    assert crawl_delay_milli(parse_robots("User-agent: *\nCrawl-delay: soon\n"), "x") == 0
    assert crawl_delay_milli([], "x", 3) == 3
    # the delay row is NOT a path rule: verdicts unchanged
    assert robots_allows(rules, "esgopeta", "/fine") is True
    assert robots_allows(rules, "esgopeta", "/slow/x") is False
    assert robots_allows(rules, "otherbot", "/private/x") is False


def test_warc_revalidation_plan_matrix(spark):
    """Validator extraction + RFC 9110 strongest-validator choice:
    ETag beats Last-Modified; RFC-822 dates normalize; non-2xx and
    validator-less records plan correctly; poison drops."""
    from esgopeta_spark.operators.web import build_warc_record, warc_revalidation_plan

    def resp(status, hdrs=""):
        return (f"HTTP/1.1 {status} X\r\n" + hdrs + "\r\nbody").encode()

    rows = [
        (1, build_warc_record("https://a.com/1", resp(200,
            'ETag: "abc"\r\nLast-Modified: Tue, 05 Mar 2024 09:30:00 GMT\r\n'))),
        (2, build_warc_record("https://a.com/2", resp(200,
            "Last-Modified: Tue, 05 Mar 2024 09:30:00 GMT\r\n"))),
        (3, build_warc_record("https://a.com/3", resp(200))),
        (4, build_warc_record("https://a.com/4", resp(404, 'ETag: "x"\r\n'))),
        (5, build_warc_record("https://a.com/5", resp(200,
            "Last-Modified: not a date\r\n"))),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    got = {r["doc_id"]: (r["etag"], r["last_modified"], r["mode"])
           for r in warc_revalidation_plan(df).collect()}
    assert got == {
        1: ('"abc"', "2024-03-05", "if-none-match"),
        2: ("", "2024-03-05", "if-modified-since"),
        3: ("", "", "unconditional"),
        5: ("", "", "unconditional"),  # unparseable date: no validator
    }


def test_sniff_charset_matrix():
    """HTML5-style charset precedence: BOM > header > meta prescan >
    utf-8; WHATWG aliasing (latin-1 family -> windows-1252, meta can
    never declare utf-16); unknown labels fall back at decode."""
    from esgopeta_spark.operators.web import decode_html_bytes, sniff_charset, sniff_payload

    page = '<!DOCTYPE html><meta charset="latin-1"><p>café — naïve</p>'
    w = page.encode("windows-1252")
    assert sniff_charset(w) == "windows-1252"
    assert decode_html_bytes(w) == page
    # BOM beats everything; the codec strips it
    u8s = page.encode("utf-8-sig")
    assert sniff_charset(u8s) == "utf-8-sig"
    assert decode_html_bytes(u8s) == page
    u16 = page.encode("utf-16")
    assert sniff_charset(u16) == "utf-16"
    assert decode_html_bytes(u16) == page
    # header beats meta
    assert (
        sniff_charset(w, {"content-type": "text/html; charset=ISO-8859-1"})
        == "windows-1252"
    )
    assert sniff_charset(b"<html>x", {"content-type": "text/html; charset=UTF-8"}) == "utf-8"
    # meta http-equiv form carries charset= inside content
    he = b'<meta http-equiv="Content-Type" content="text/html; charset=cp1252">'
    assert sniff_charset(he) == "windows-1252"
    # meta claiming utf-16 is a lie by construction -> utf-8
    assert sniff_charset(b'<meta charset="utf-16">') == "utf-8"
    # unknown label passes through and decode falls back, total
    assert sniff_charset(b'<meta charset="x-bogus-enc">') == "x-bogus-enc"
    assert isinstance(decode_html_bytes(b'<meta charset="x-bogus-enc">abc'), str)
    # default
    assert sniff_charset(b"<p>plain</p>") == "utf-8"
    # BOM'd markup now sniffs as html (the prescan rationale)
    assert sniff_payload(u16) == "html"
    assert sniff_payload(u8s) == "html"


def test_sniff_charset_prescan_structure_aware():
    """r10 ADVICE #3: a 'charset=' that is NOT a real declaration must
    not win the prescan — non-declaration attribute values and
    commented-out metas are skipped; real forms still work."""
    from esgopeta_spark.operators.web import sniff_charset

    # charset= inside an unrelated attribute value (no http-equiv)
    assert (
        sniff_charset(b'<meta name="x" content="see charset=shift_jis docs"><p>t</p>')
        == "utf-8"
    )
    # commented-out meta in the first 1024 bytes
    assert (
        sniff_charset(b'<!-- <meta charset="koi8-r"> --><p>t</p>') == "utf-8"
    )
    # a comment before the REAL meta doesn't hide it
    assert (
        sniff_charset(b'<!-- note --><meta charset="cp1252">') == "windows-1252"
    )
    # http-equiv form still carries charset inside content
    assert (
        sniff_charset(
            b'<meta http-equiv="content-type" content="text/html; charset=latin1">'
        )
        == "windows-1252"
    )
    # unquoted attribute forms
    assert sniff_charset(b"<meta charset=utf-8>") == "utf-8"
    # first meta with a real declaration wins over later ones
    assert (
        sniff_charset(b'<meta name=a content="charset=bogus"><meta charset=cp1252>')
        == "windows-1252"
    )


def test_parse_feed_matrix_and_fuzz():
    """Feed parsing: RSS text-link + RFC822 date, Atom href-link + ISO
    date, entity/whitespace normalization, linkless entries dropped —
    and totality on garbage/truncations."""
    import random

    from esgopeta_spark.operators.web import parse_feed

    rss = (
        "<rss><channel><item><title>Post 7 &amp; more</title>"
        "<link>https://a.com/p/7</link>"
        "<pubDate>Tue, 5 Mar 2024 09:30:00 GMT</pubDate></item>"
        "<item><title> second  post </title><link>https://a.com/a/7</link>"
        "</item><item><title>no link</title></item></channel></rss>"
    )
    assert parse_feed(rss) == [
        ("rss", "Post 7 & more", "https://a.com/p/7", "2024-03-05"),
        ("rss", "second post", "https://a.com/a/7", ""),
    ]
    atom = (
        '<feed><entry><title>Entry 8</title><link href="https://a.com/p/8"/>'
        "<updated>2024-04-06T09:30:00Z</updated></entry>"
        '<entry><title>alt</title><link rel="alternate" href="/a/8"/>'
        "</entry></feed>"
    )
    assert parse_feed(atom) == [
        ("atom", "Entry 8", "https://a.com/p/8", "2024-04-06"),
        ("atom", "alt", "/a/8", ""),
    ]
    # unparseable dates degrade to '' — never raise
    assert parse_feed(
        "<item><link>x</link><pubDate>whenever</pubDate></item>"
    ) == [("rss", "", "x", "")]
    rng = random.Random(0xFEED)
    base = rss + atom
    for trial in range(300):
        if trial % 2 == 0:
            s = "".join(
                rng.choice('<>&;="\'item entry/\n\t') for _ in range(rng.randrange(0, 120))
            )
        else:
            s = base[: rng.randrange(0, len(base))]
        for kind, title, link, pub in parse_feed(s):
            assert kind in ("rss", "atom") and link != ""
            assert "\n" not in title and (pub == "" or len(pub) == 10)


def test_revalidation_and_delay_stream_twins(spark, tmp_path):
    """The r11 stateless crawl kernels run on streams AS-IS (share the
    batch projection, don't mirror): revalidation planning and
    robots-delay extraction, multi-batch arrival."""
    from esgopeta_spark.operators.web import (
        build_warc_record,
        robots_delay,
        warc_revalidation_plan,
    )

    rows = [
        (i, build_warc_record(
            f"https://h{i}.com/p",
            (f'HTTP/1.1 200 OK\r\nETag: "e{i}"\r\n\r\nbody').encode(),
        ))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    want = {tuple(r) for r in warc_revalidation_plan(df).collect()}
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "reval"))
    stream = spark.readStream.schema("doc_id long, warc binary").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(tmp_path / "reval"))
    q = (
        warc_revalidation_plan(stream)
        .writeStream.format("memory").queryName("revalstream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(180)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM revalstream").collect()}
    assert got == want and len(got) == 6

    drows = [(i, f"User-agent: *\nCrawl-delay: {i}.5\n") for i in range(4)]
    ddf = spark.createDataFrame(drows, "doc_id: long, robots: string")
    wantd = {tuple(r) for r in robots_delay(ddf).collect()}
    ddf.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "delays"))
    dstream = spark.readStream.schema("doc_id long, robots string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(tmp_path / "delays"))
    q2 = (
        robots_delay(dstream)
        .writeStream.format("memory").queryName("delaystream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q2.awaitTermination(180)
    finally:
        q2.stop()
    gotd = {tuple(r) for r in spark.sql("SELECT * FROM delaystream").collect()}
    assert gotd == wantd and {r[2] for r in gotd} == {500, 1500, 2500, 3500}


def test_expand_sitemap_frontier_edge_cases(spark):
    """Recursion edge cases beyond the fixture entry: seed missing from
    the store (unfetched at depth 0), max_depth=0 (children cap
    immediately), a two-node sitemap cycle (each parsed once, no dup
    rows, no hang), and duplicate child listings dedup."""
    from esgopeta_spark.operators.web import expand_sitemap_frontier

    store = spark.createDataFrame(
        [
            ("https://h.com/a.xml",
             "<sitemapindex><sitemap><loc>https://h.com/b.xml</loc></sitemap>"
             "<sitemap><loc>https://h.com/b.xml</loc></sitemap></sitemapindex>"),
            ("https://h.com/b.xml",
             "<sitemapindex><sitemap><loc>https://h.com/a.xml</loc></sitemap>"
             "</sitemapindex>"
             "<urlset><url><loc>https://h.com/p1</loc></url></urlset>"),
        ],
        "url: string, xml: string",
    )
    seeds = spark.createDataFrame([("https://h.com/a.xml",),
                                   ("https://h.com/nope.xml",)], "url: string")
    got = {tuple(r) for r in
           expand_sitemap_frontier(seeds, store, max_depth=3).collect()}
    assert got == {
        ("https://h.com/nope.xml", "unfetched", "", -1, 0),
        ("https://h.com/p1", "page", "", 500, 1),
        # a.xml re-listed by b.xml: seen -> no second parse, no row
    }
    # max_depth=0: the root parses, its children cap visibly
    got0 = {tuple(r) for r in
            expand_sitemap_frontier(
                seeds.filter("url like '%a.xml'"), store, max_depth=0
            ).collect()}
    assert got0 == {("https://h.com/b.xml", "depth-capped", "", -1, 1)}


def test_robots_sitemaps_matrix():
    """Sitemap: directives live outside agent groups: case-insensitive
    key, comments stripped, empties dropped, order kept; the URL's own
    colon survives the key split."""
    from esgopeta_spark.operators.web import robots_sitemaps

    txt = (
        "# header\nUser-agent: *\nDisallow: /x\n"
        "Sitemap: https://h.com/a.xml\n"
        "sitemap:https://h.com/b.xml   \n"
        "SITEMAP: \n"  # empty value: dropped
        "Sitemap: https://h.com/c.xml # trailing comment\n"
    )
    assert robots_sitemaps(txt) == [
        "https://h.com/a.xml", "https://h.com/b.xml", "https://h.com/c.xml"
    ]
    assert robots_sitemaps("") == []
    assert robots_sitemaps("no directives here") == []


# ---------------------------------------------------------------------------
# HTTP Content-Encoding unwrap (r11 third wave)
# ---------------------------------------------------------------------------


def test_content_encoding_matrix():
    """Every coding the unwrap layer claims: gzip/x-gzip, zlib deflate,
    the raw-deflate server bug, identity/empty, and a comma list
    applied right-to-left (header names codings in order APPLIED)."""
    import zlib

    from esgopeta_spark.operators.web import (
        decode_content_encoding,
        encode_content_body,
    )

    body = "page «text» ☃ " * 50
    raw = body.encode("utf-8")
    assert decode_content_encoding("gzip", encode_content_body("gzip", raw)) == raw
    assert decode_content_encoding("x-gzip", encode_content_body("gzip", raw)) == raw
    assert decode_content_encoding("deflate", zlib.compress(raw)) == raw
    assert (
        decode_content_encoding("deflate", encode_content_body("deflate-raw", raw))
        == raw
    )
    assert decode_content_encoding("identity", raw) == raw
    assert decode_content_encoding("", raw) == raw
    # 'deflate, gzip' means deflate applied first, gzip outermost:
    # decode gunzips, then inflates
    layered = encode_content_body("gzip", zlib.compress(raw))
    assert decode_content_encoding("deflate, gzip", layered) == raw


def test_content_encoding_modern_matrix():
    """r13: zstd (RFC 8878) and brotli (RFC 7932) round-trip through
    the unwrap; the from-scratch zstd decoder and the pyarrow C path
    return identical bytes; layered modern codings apply right-to-left."""
    from esgopeta_spark.operators.web import (
        decode_content_encoding,
        encode_content_body,
    )
    from esgopeta_spark.operators.zstd import zstd_decompress

    raw = ("page «text» ☃ " * 50).encode("utf-8")
    for enc in ("zstd", "br"):
        assert decode_content_encoding(enc, encode_content_body(enc, raw)) == raw
    comp = encode_content_body("zstd", raw)
    # the two zstd tiers are byte-equal on the same body
    assert zstd_decompress(comp) == decode_content_encoding("zstd", comp) == raw
    # 'zstd, gzip': zstd applied first, gzip outermost
    layered = encode_content_body("gzip", comp)
    assert decode_content_encoding("zstd, gzip", layered) == raw


def test_warc_zst_ingest():
    """r13: .warc.zst blobs (the archive format newer crawls ship)
    decode through maybe_gunzip_warc — plain frames, multi-frame
    concatenation, and the skippable-dictionary-frame prefix the
    format convention allows; garbage zstd quarantines as ValueError."""
    import struct

    import pyarrow as pa

    from esgopeta_spark.operators.web import (
        build_warc_record,
        maybe_gunzip_warc,
        parse_warc,
    )

    rec = build_warc_record(
        "https://h/x", b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi"
    ) * 3
    z = pa.Codec("zstd").compress(rec, asbytes=True)
    assert maybe_gunzip_warc(z) == rec
    sk = struct.pack("<II", 0x184D2A5D, 4) + b"dict"
    assert maybe_gunzip_warc(sk + z) == rec
    assert len(parse_warc(maybe_gunzip_warc(z))) == 3
    with pytest.raises(ValueError):
        maybe_gunzip_warc(b"\x28\xb5\x2f\xfd" + b"garbage frame body")


def test_content_encoding_quarantine():
    """Corrupt streams raise ValueError ONLY (the stage-survival
    contract) for EVERY coding — r13: br/zstd now decode for real, so
    garbage bodies must quarantine through the new decoders too."""
    import pytest as _pytest

    from esgopeta_spark.operators.web import (
        decode_content_encoding,
        encode_content_body,
    )

    raw = b"x" * 100
    for enc, body in [
        ("br", raw),
        ("zstd", raw),
        ("gzip", b"\x1f\x8b garbage"),
        ("gzip", encode_content_body("gzip", raw)[:-4]),  # truncated... still
        ("deflate", b"\x00\x01\x02"),
    ]:
        try:
            out = decode_content_encoding(enc, body)
        except ValueError:
            continue
        # a truncated gzip that zlib happens to accept would return —
        # only the garbage br/zstd rows are REQUIRED to raise
        assert enc not in ("br", "zstd"), out


def test_http_unwrap_end_to_end():
    """Full wire shape by row class: chunked framing layered outside a
    gzip body de-chunks THEN decodes; header value surfaces; a corrupt
    body quarantines to a visible error row, never kills the batch."""
    from esgopeta_spark.operators.web import (
        _chunk_body,
        build_warc_record,
        encode_content_body,
        parse_http_response,
        parse_warc,
    )

    page = "<html><head><meta charset=\"utf-8\"></head><body>Hi é</body></html>"
    raw = page.encode("utf-8")
    gz = encode_content_body("gzip", raw)
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + _chunk_body(gz, 7)
    )
    status, hdrs, body = parse_http_response(payload)
    assert (status, body) == (200, raw)
    assert hdrs["content-encoding"] == "gzip"
    # corrupt: the gzip bytes, byte-flipped mid-stream
    bad = bytearray(gz)
    bad[len(bad) // 2] ^= 0xFF
    corrupt = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bytes(bad)
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_http_response(corrupt)
    # and the digest kernel surfaces it as an error row (spark-side
    # covered by the stream twin below; here pin the record framing)
    rec = parse_warc(build_warc_record("https://h/x", corrupt))[0]
    assert rec["payload"] == corrupt


def test_http_unwrap_digest_stream_twin(spark, tmp_path):
    """The digest chain is stateless: the SAME projection runs on a
    stream and matches batch row-for-row (house batch≡stream rule)."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.web import (
        http_unwrap_digest,
        synth_encoded_warc,
        synth_html,
    )

    docs = [(i, f"body {i} & <text>") for i in range(24)]
    base = spark.createDataFrame(docs, "doc_id: long, text: string").select(
        "doc_id",
        F.concat(F.lit("https://h/"), F.col("doc_id")).alias("uri"),
        synth_html(F.col("doc_id"), F.col("text")).alias("page"),
    )
    fixed = synth_encoded_warc(base).drop("page")
    want = {tuple(r) for r in http_unwrap_digest(fixed).collect()}
    assert len(want) == 24 and all(r[3] != "error" for r in want)

    fixed.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "enc_in"))
    stream = spark.readStream.schema(fixed.schema).parquet(str(tmp_path / "enc_in"))
    q = (
        http_unwrap_digest(stream)
        .writeStream.format("memory")
        .queryName("encstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM encstream").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# rel=canonical hints (r11 third wave)
# ---------------------------------------------------------------------------


def test_extract_canonical_matrix():
    """The WHATWG/RFC 6596 corners: token-list rel (any case, any
    order), quote styles, entity decode, first-wins, non-canonical
    links skipped, <linkfoo> non-tags skipped, href-less canonical
    declares nothing, unterminated tag drops the tail; total on
    garbage."""
    from esgopeta_spark.operators.web import extract_canonical

    assert extract_canonical(
        '<link rel="stylesheet" href="/s.css">'
        "<LINK REL='alternate CANONICAL' HREF='/c?a=1&amp;b=2'>"
        '<link rel="canonical" href="/WRONG">'
    ) == "/c?a=1&b=2"
    assert extract_canonical('<link rel=canonical href=/bare>') == "/bare"
    assert extract_canonical('<link href="/x" rel="Canonical">') == "/x"
    assert extract_canonical('<linkfoo rel="canonical" href="/n">') == ""
    assert extract_canonical('<link rel="canonicalish" href="/n">') == ""
    assert extract_canonical('<link rel="canonical">') == ""
    assert extract_canonical('<link rel="canonical" href="/u"') == ""  # unterminated
    assert extract_canonical("") == ""
    assert extract_canonical("<p>no links</p>") == ""
    # quoted '>' inside an attribute must not terminate the tag
    assert extract_canonical(
        '<link data-x="a>b" rel="canonical" href="/q">'
    ) == "/q"


def test_canonical_hints_stream_twin(spark, tmp_path):
    """canonical_hints is a stateless projection: stream run matches
    batch bit-for-bit, including the self-canonical fallback and
    RFC 3986 relative resolution against the page URL."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.web import canonical_hints

    rows = [
        (0, "https://h.com/a/b?x=1", '<link rel="canonical" href="../c">'),
        (1, "https://h.com/a/b", ""),  # declares nothing -> self
        (2, "https://h.com/d", '<link rel="canonical" href="//cdn.h.com/e?utm_k=1">'),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url_canon: string, html: string")
    want = {tuple(r) for r in canonical_hints(df).collect()}
    assert ("https://h.com/c" in {r[3] for r in want}
            and "https://h.com/a/b" in {r[3] for r in want}
            and "https://cdn.h.com/e" in {r[3] for r in want})

    df.coalesce(1).write.mode("overwrite").json(str(tmp_path / "canon_in"))
    stream = spark.readStream.schema(df.schema).json(str(tmp_path / "canon_in"))
    q = (
        canonical_hints(stream)
        .writeStream.format("memory").queryName("canonstream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM canonstream").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# robots META + rel=nofollow policy (r11 third wave)
# ---------------------------------------------------------------------------


def test_meta_robots_matrix():
    from esgopeta_spark.operators.web import meta_robots

    assert meta_robots("") == (0, 0)
    assert meta_robots('<meta name="robots" content="noindex">') == (1, 0)
    assert meta_robots("<META NAME='robots' CONTENT='NOFOLLOW , x'>") == (0, 1)
    assert meta_robots('<meta name="robots" content="none">') == (1, 1)
    assert meta_robots('<meta name="robots" content="noindex,nofollow">') == (1, 1)
    # union across tags (most-restrictive wins)
    assert meta_robots(
        '<meta name="robots" content="noindex">'
        '<meta name="robots" content="nofollow">'
    ) == (1, 1)
    # scoped metas are for someone else; name must be exactly robots
    assert meta_robots('<meta name="googlebot" content="noindex">') == (0, 0)
    assert meta_robots('<meta name="robotsx" content="noindex">') == (0, 0)
    # quoted '>' does not end the tag; unterminated tag drops the tail
    assert meta_robots('<meta data-x="a>b" name="robots" content="none">') == (1, 1)
    assert meta_robots('<meta name="robots" content="none"') == (0, 0)
    # a content-less robots meta declares nothing
    assert meta_robots('<meta name="robots">') == (0, 0)


def test_extract_links_rel_flags_and_blind_view():
    from esgopeta_spark.operators.web import extract_links, extract_links_rel

    html = (
        '<a href="/a">x</a>'
        '<a rel="nofollow" href="/b">y</a>'
        "<a rel='UGC sponsored' href='/c'>z</a>"
        '<a rel="author" href="/d">w</a>'
        '<abbr rel="nofollow">not a link</abbr>'
    )
    assert extract_links_rel(html) == [
        ("/a", 0), ("/b", 1), ("/c", 1), ("/d", 0)
    ]
    # the rel-blind view is the same scanner (refactor guard)
    assert extract_links(html) == ["/a", "/b", "/c", "/d"]


def test_policy_link_edges_stream_twin(spark, tmp_path):
    from esgopeta_spark.operators.web import policy_link_edges

    rows = [
        (0, "https://h.com/", '<a href="/f">a</a><a rel="nofollow" href="/n">b</a>'),
        (1, "https://h.com/",
         '<meta name="robots" content="none"><a href="/f">a</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, base_url: string, html: string")
    want = {tuple(r) for r in policy_link_edges(df).collect()}
    assert ((0, "/f", "https://h.com/f", 0, 0, 0, 1) in want
            and (0, "/n", "https://h.com/n", 1, 0, 0, 0) in want
            and (1, "/f", "https://h.com/f", 0, 1, 1, 0) in want)

    df.coalesce(1).write.mode("overwrite").json(str(tmp_path / "pol_in"))
    stream = spark.readStream.schema(df.schema).json(str(tmp_path / "pol_in"))
    q = (
        policy_link_edges(stream)
        .writeStream.format("memory").queryName("polstream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        assert q.awaitTermination(120)
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM polstream").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# host-template line removal (r11 third wave)
# ---------------------------------------------------------------------------


def test_host_template_lines_semantics(spark):
    """The evidence rules, pinned at the boundary: per-DOC votes (a
    line repeated inside one page is one vote), the >=50% milli
    threshold is inclusive, min_docs gates small hosts, removal keeps
    line order, and a doc whose every line is template cleans to ''."""
    from esgopeta_spark.operators.web import host_template_lines

    rows = [
        # host A, 6 docs: 'tpl' in all 6 (removed), 'half' in exactly
        # 3 of 6 (3 votes >= min_docs AND 3*1000 = 500*6 -> the
        # threshold is INCLUSIVE, removed), body lines unique (kept)
        (0, "A", "tpl\nhalf\nbody zero"),
        (1, "A", "tpl\nhalf\nbody one"),
        (2, "A", "tpl\ntpl\nhalf\nbody two"),  # in-doc repeat: 1 vote
        (3, "A", "tpl"),                         # all-template doc -> ''
        (6, "A", "tpl\nbody six"),
        (7, "A", "tpl\nbody seven"),
        # host B, 2 docs < min_docs: nothing removed however frequent
        (4, "B", "tpl\nbody four"),
        (5, "B", "tpl\nbody five"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, host: string, text: string")
    got = {r["doc_id"]: (r["n_lines"], r["n_dropped"], r["clean_text"])
           for r in host_template_lines(df).collect()}
    assert got[0] == (3, 2, "body zero")
    assert got[1] == (3, 2, "body one")
    assert got[2] == (4, 3, "body two")           # both tpl copies dropped
    assert got[3] == (1, 1, "")                    # visible empty, not missing
    assert got[6] == (2, 1, "body six")
    assert got[7] == (2, 1, "body seven")
    assert got[4] == (2, 0, "tpl\nbody four")      # min_docs gate
    assert got[5] == (2, 0, "tpl\nbody five")


def test_template_lines_plan_posture(spark, sf_dir):
    """All-codegen: the template set and host counts come back as
    BROADCAST equi joins (bounded by template size at any corpus
    scale); no cartesian, no nested loop, no Python in the lineage."""
    from esgopeta_spark.plans import REGISTRY
    from tests.test_plans import plan_of

    p = plan_of(REGISTRY["web_template_lines"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "BroadcastHashJoin" in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p


def test_policy_frontier_plan_posture(spark, sf_dir):
    """The r11 policy-frontier capstone: one dedup aggregate + one
    host-keyed window; no cartesian, no nested loop, and no join at
    all (the union IS the fan-in)."""
    from esgopeta_spark.plans import REGISTRY
    from tests.test_plans import plan_of

    p = plan_of(REGISTRY["pipeline_policy_frontier"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert "Union" in p and "Window" in p, p


def test_conditional_fetch_merge_semantics(spark):
    """Receive-side revalidation pins: 304 resolves to the stored copy,
    200 to the network body, a store-less 304 is a VISIBLE miss, a
    poison record a visible error row; one equi join, no cartesian."""
    import hashlib

    from esgopeta_spark.operators.web import (
        build_warc_record,
        conditional_fetch_merge,
    )

    def warc(uri, payload):
        return build_warc_record(uri, payload)

    rows = [
        (0, warc("https://h/a", b'HTTP/1.1 304 Not Modified\r\nETag: "x"\r\n\r\n')),
        (1, warc("https://h/b", b"HTTP/1.1 200 OK\r\n\r\nfresh body")),
        (2, warc("https://h/c", b'HTTP/1.1 304 Not Modified\r\n\r\n')),  # no store
        (3, b"not a warc at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    store = spark.createDataFrame(
        [("https://h/a", "cafecafe"), ("https://h/b", "ignored")],
        "url: string, page_md5: string",
    )
    out = conditional_fetch_merge(df, store)
    got = {r["doc_id"]: (r["status"], r["fetch_source"], r["page_md5"])
           for r in out.collect()}
    assert got[0] == (304, "cache", "cafecafe")
    assert got[1] == (200, "network",
                      hashlib.md5(b"fresh body").hexdigest())
    assert got[2] == (304, "miss", "")
    assert got[3][1] == "error" and got[3][2] == ""
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_idn_canonicalization_matrix():
    """IDN folding in the canonicalizer: non-ASCII labels punycode
    (after lowercasing), ASCII labels pass, both wire forms of one
    host dedup to one key, unencodable labels keep the host (total),
    and pure-ASCII behavior is bit-unchanged (regression guard)."""
    from esgopeta_spark.operators.web import canonicalize_url

    assert canonicalize_url("https://münchen.example/p") == \
        "https://xn--mnchen-3ya.example/p"
    assert canonicalize_url("https://MÜNCHEN.example.:443/p") == \
        "https://xn--mnchen-3ya.example/p"
    # already-encoded wire form: same canonical key
    assert canonicalize_url("https://xn--mnchen-3ya.example/p") == \
        "https://xn--mnchen-3ya.example/p"
    assert canonicalize_url("https://docs.例え.example/x") == \
        "https://docs.xn--r8jz45g.example/x"
    # unencodable (an empty label from '..') keeps the host, total
    assert canonicalize_url("https://a..ü.example/x").startswith("https://")
    # ASCII regression: untouched
    assert canonicalize_url("HTTP://Site.Example.com:80/a?utm_x=1&b=2") == \
        "http://site.example.com/a?b=2"


def test_extract_meta_refresh_matrix():
    """WHATWG declarative-refresh corners: bare delay (self-reload,
    target ''), fractional digit-wise milli, comma/semicolon
    separators, spaced URL= key, quoted targets, first-wins,
    non-refresh metas skipped, malformed content declares nothing,
    total on garbage."""
    from esgopeta_spark.operators.web import extract_meta_refresh

    f = extract_meta_refresh
    assert f('<meta http-equiv="refresh" content="5">') == (5000, "")
    assert f('<meta http-equiv="refresh" content="0;url=/x">') == (0, "/x")
    assert f("<META HTTP-EQUIV=Refresh CONTENT='2.5 , URL = \"/y\"'>") == (2500, "/y")
    assert f('<meta http-equiv="refresh" content="1.25;/bare">') == (1250, "/bare")
    assert f('<meta http-equiv="refresh" content="3;url=a&amp;b">') == (3000, "a&b")
    assert f(
        '<meta http-equiv="refresh" content="1;url=/first">'
        '<meta http-equiv="refresh" content="2;url=/second">'
    ) == (1000, "/first")
    assert f('<meta name="refresh" content="1;url=/n">') is None
    assert f('<meta http-equiv="refresh" content="soon;url=/n">') is None
    assert f('<meta http-equiv="refresh">') is None
    assert f("") is None and f("<p>hi</p>") is None
    assert f('<meta http-equiv="refresh" content="1;url=/u"') is None  # unterminated


def test_host_components_plan_posture(spark, sf_dir):
    """Host components: iterative equi joins only (the dup_components
    machinery); no cartesian, no nested loop anywhere in the lineage;
    the isolated host comes back as a singleton."""
    from esgopeta_spark.plans import REGISTRY
    from tests.test_plans import plan_of

    df = REGISTRY["web_host_components"].fn(spark, sf_dir)
    p = plan_of(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    rows = {r["host_id"]: (r["comp"], r["comp_size"]) for r in df.collect()}
    assert rows[37] == (37, 1) and rows[36] == (36, 3) and rows[5] == (4, 4)


def test_parse_xrobots_matrix():
    """X-Robots-Tag parsing pins (r12): token lists, 'none', case,
    agent-scoped values ignored, unavailable_after tolerated, total on
    junk."""
    from esgopeta_spark.operators.web import parse_xrobots

    assert parse_xrobots("") == (0, 0)
    assert parse_xrobots("noindex") == (1, 0)
    assert parse_xrobots("NOFOLLOW , noarchive") == (0, 1)
    assert parse_xrobots("none") == (1, 1)
    assert parse_xrobots("noindex, nofollow") == (1, 1)
    assert parse_xrobots("googlebot: noindex") == (0, 0)  # scoped: not us
    assert parse_xrobots("otherbot: none, nofollow") == (0, 0)
    assert parse_xrobots("unavailable_after: 25 Jun 2030 15:00:00 PST") == (0, 0)
    assert parse_xrobots("noindex, unavailable_after: 25 Jun 2030") == (1, 0)
    assert parse_xrobots(":::,,,") == (0, 0)
    # r13 (r12 ADVICE): a value-taking directive before ':' is NOT an
    # agent scope — the trailing noindex/nofollow must register
    assert parse_xrobots("max-snippet: -1, noindex") == (1, 0)
    assert parse_xrobots("max-snippet: 20, noindex") == (1, 0)
    assert parse_xrobots("max-image-preview: large, nofollow") == (0, 1)
    assert parse_xrobots("MAX-VIDEO-PREVIEW: 0, none") == (1, 1)
    assert parse_xrobots("max-snippet: 20") == (0, 0)  # value alone: no flags
    # an agent scope wrapping a value-taking directive is still scoped
    assert parse_xrobots("googlebot: max-snippet: 20, noindex") == (0, 0)


def test_warc_robots_directives_header_beats_missing_meta(spark):
    """The header path works on NON-html bodies (the PDF case meta can
    never cover) and unions with meta on html; poison surfaces."""
    from esgopeta_spark.operators.web import (
        build_warc_record,
        warc_robots_directives,
    )

    pdfish = b"%PDF-1.4 fake body"
    rows = [
        (0, build_warc_record(
            "https://h/a.pdf",
            b"HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n\r\n" + pdfish)),
        (1, build_warc_record(
            "https://h/b",
            b"HTTP/1.1 200 OK\r\nX-Robots-Tag: nofollow\r\n\r\n"
            b"<!DOCTYPE html><html><head>"
            b'<meta name="robots" content="noindex"></head><body>x</body></html>')),
        (2, b"garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, warc: binary")
    got = {r["doc_id"]: (r["hdr_noindex"], r["meta_noindex"],
                         r["noindex"], r["nofollow"])
           for r in warc_robots_directives(df).collect()}
    assert got[0] == (1, 0, 1, 0)   # header gates the PDF
    assert got[1] == (0, 1, 1, 1)   # union of header nofollow + meta noindex
    assert got[2] == (-1, -1, -1, -1)
