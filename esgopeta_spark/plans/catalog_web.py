"""Catalog entries for the crawl front-end (G4 — r10): HTML->text
extraction and URL canonicalization + dedup, the stage every real
pretraining pipeline starts with (C4 §2.1, CCNet §3).

Oracle strategy is the FLAC encoder-twin pattern: the Spark side
synthesizes a deterministic fixture (page / URL-variant set) from the
corpus in pure codegen, runs the REAL kernel over it, and DuckDB
recomputes the expected output in closed form from the source text —
hash-exact with no HTML/URL machinery on the oracle side.  The kernels'
general behavior (malformed markup, entity matrix, canonicalization
matrix, fuzz no-raise) is pinned separately in tests/test_web.py.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve under PEP 563

from pyspark.sql import functions as F

from esgopeta_spark.plans.catalog import T, register

# closed-form expected extraction: title line, collapsed corpus text
# (dropped when empty), the constant entity fixture line, a length
# trailer — everything else on the synthesized page (script/style
# content, nav/footer boilerplate, comments) must be dropped by the
# extractor or the hash mismatches
_HTML_EXTRACT_SQL = r"""
    WITH c AS (
      SELECT doc_id,
             trim(regexp_replace(coalesce(text, ''), '[ \t\n\r\f\v]+', ' ', 'g')) AS t,
             length(coalesce(text, '')) AS n
      FROM documents
    )
    SELECT doc_id,
           'Doc ' || doc_id || chr(10)
           || CASE WHEN t = '' THEN '' ELSE t || chr(10) END
           || 'Q&A — café €5 <em> ☺ ©' || chr(10)
           || 'Length: ' || n AS clean_text,
           CAST(CASE WHEN t = '' THEN 3 ELSE 4 END AS INTEGER) AS n_lines
    FROM c
"""


@register(
    "text_html_extract",
    "G4",
    _HTML_EXTRACT_SQL,
    doc="crawl front-end: WET-style HTML->text extraction (r10) — "
    "synthesize a fixture page per doc in codegen (title, script/style "
    "with adversarial quoted markup, nav/footer boilerplate, a comment "
    "wrapping fake tags, a quoted '>' attribute, the escaped corpus "
    "text, an entity matrix line), then run the REAL single-pass "
    "extractor kernel: comment/doctype strip, raw-text element drop, "
    "boilerplate-subtree drop, block segmentation to lines, named + "
    "numeric entity decode (windows-1252 C1 remap), ASCII whitespace "
    "collapse.  Oracle recomputes the expected clean text in closed "
    "form from documents.text (encoder-twin pattern).  Plan: one "
    "codegen synth projection + one Arrow kernel, shuffle-free; "
    "operators/web.py extract_html_text",
)
def text_html_extract(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions
    from esgopeta_spark.operators.web import html_extract, synth_html

    d = ensure_min_partitions(  # r13: widen the single-row-group scan
        T(spark, sf, "documents")).select(
        "doc_id",
        synth_html(F.col("doc_id"), F.coalesce(F.col("text"), F.lit(""))).alias("html"),
    )
    return html_extract(d)


@register(
    "web_url_canonical_dedup",
    "G1,G4",
    r"""
    SELECT 'https://site' || (doc_id % 40) || '.example.com/articles/' || doc_id
             || '?page=' || (doc_id % 7) AS url_canon,
           CAST(5 AS BIGINT) AS n_variants,
           doc_id
    FROM documents
    """,
    doc="URL canonicalization + URL-level dedup (r10): five codegen "
    "syntactic variants per doc (uppercase scheme/host + default port "
    "+ fragment, tracking params, percent-encoded unreserved char, "
    "param reorder + empty segment) must all canonicalize to the seed "
    "the oracle recomputes in closed form; exact-dup groups by the "
    "canonical key (count + min doc id per group — the keeper shape "
    "of dedup_exact_docs).  Plan: codegen variant explode + Arrow "
    "kernel + one groupBy shuffle on the canonical key; "
    "operators/web.py canonicalize_url",
)
def web_url_canonical_dedup(spark, sf):
    from esgopeta_spark.operators.web import synth_url_variants, url_canonicalize

    # r14 (optimization): A/B'd a scan widening and left the serial
    # shape — the canonicalizer is a light per-row kernel; the clean
    # interleaved probe (paired with web_xrobots_gate) read serial
    # 1.18 s vs widened 1.86 s for the pair.
    d = T(spark, sf, "documents").select(
        "doc_id", F.explode(synth_url_variants(F.col("doc_id"))).alias("url")
    )
    return (
        url_canonicalize(d)
        .groupBy("url_canon")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("doc_id"),
        )
    )


# closed-form n_chars of the extracted page: 36 fixed chars ('Doc ' = 4,
# two joining newlines = 2, entity line = 22, 'Length: ' = 8) + the id
# and length digit widths + the collapsed text and its newline when
# non-empty — then the exact split_train_shards md5 assignment
_HTML_SHARDS_SQL = r"""
    WITH c AS (
      SELECT doc_id,
             trim(regexp_replace(coalesce(text, ''), '[ \t\n\r\f\v]+', ' ', 'g')) AS t,
             length(coalesce(text, '')) AS n
      FROM documents
    ), ext AS (
      SELECT doc_id,
             CAST(36 + length(CAST(doc_id AS VARCHAR))
                  + CASE WHEN t = '' THEN 0 ELSE length(t) + 1 END
                  + length(CAST(n AS VARCHAR)) AS BIGINT) AS n_chars
      FROM c
    ), gated AS (
      SELECT doc_id, n_chars FROM ext WHERE n_chars >= 160
    ), s AS (
      SELECT doc_id, n_chars,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) AS BIGINT) AS d1,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))
                  AS UBIGINT) AS BIGINT) AS d2
      FROM gated
    ), a AS (
      SELECT doc_id, n_chars,
             CASE WHEN d1 < 3435973836 THEN 'train'
                  WHEN d1 < 3865470566 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(d2 % 8 AS INTEGER) AS shard
      FROM s
    )
    SELECT split, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM a GROUP BY split, shard
"""


@register(
    "pipeline_html_to_shards",
    "G4,E5",
    _HTML_SHARDS_SQL,
    doc="fused crawl-to-writer pipeline (r10 capstone): HTML synth "
    "(codegen) -> REAL extraction kernel -> length gate on the clean "
    "text -> deterministic md5 split/shard -> per (split, shard) "
    "rollup, ONE Catalyst lineage over one documents scan — the page a "
    "crawler hands you becomes writer-sharded training text in a "
    "single plan.  Oracle composes the extraction closed form with the "
    "split_train_shards SQL.  Plan: codegen synth + one Arrow kernel + "
    "codegen gate/split + one final shuffle on (split, shard); "
    "operators/web.py + operators/text.py split_shards",
)
def pipeline_html_to_shards(spark, sf):
    from esgopeta_spark.operators.text import split_shards
    from esgopeta_spark.operators.web import html_extract, synth_html

    d = T(spark, sf, "documents").select(
        "doc_id",
        synth_html(F.col("doc_id"), F.coalesce(F.col("text"), F.lit(""))).alias("html"),
    )
    ext = html_extract(d).select(
        "doc_id", F.length("clean_text").cast("bigint").alias("n_chars")
    )
    gated = ext.filter(F.col("n_chars") >= 160)
    sharded = split_shards(gated)
    return sharded.groupBy("split", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# extracts to "quick link another link more links final link": 8 words,
# 42 anchor chars over 45 line chars = 933 milli (the oracle literal)
_FARM_HTML = (
    '<p><a href="/1">quick link</a> <a href="/2">another link</a> '
    '<a href="/3">more links</a> <a href="/4">final link</a></p>'
)


@register(
    "text_html_main_content",
    "G4",
    r"""
    WITH c AS (
      SELECT doc_id,
             trim(regexp_replace(text, '[ \t\n\r\f\v]+', ' ', 'g')) AS t,
             length(CAST(doc_id AS VARCHAR)) AS L
      FROM documents WHERE trim(text) <> ''
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS block_idx, t AS block_text,
           CAST(len(string_split(t, ' ')) AS INTEGER) AS n_words,
           CAST(0 AS BIGINT) AS anchor_milli,
           CASE WHEN len(string_split(t, ' ')) < 8 THEN 'short'
                ELSE 'content' END AS cls
    FROM c
    UNION ALL
    SELECT doc_id, 1, 'quick link another link more links final link',
           8, 933, 'boilerplate'
    FROM c
    UNION ALL
    SELECT doc_id, 2,
           'see ref ' || doc_id || ' for more details about this topic here',
           10, ((4 + L) * 1000) // (47 + L), 'content'
    FROM c
    """,
    doc="main-content block scoring (r10 — the jusText core signals, "
    "Pomikalek 2011): the block walker tracks per-line anchor text, so "
    "each block gets a link density (anchor chars per 1000 line chars, "
    "integer div) and a word count; classification = short / "
    "boilerplate (link-dense menus, tag clouds) / content, pure "
    "codegen.  Fixture page per doc: nav (dropped), the corpus text "
    "paragraph (anchor-free), a literal 8-word link farm (933 milli -> "
    "boilerplate), and a mixed paragraph whose density the oracle "
    "recomputes in closed form from the doc-id digit width.  Plan: one "
    "Arrow kernel + posexplode + codegen classify, shuffle-free; "
    "operators/web.py extract_html_blocks/classify_blocks",
)
def text_html_main_content(spark, sf):
    from esgopeta_spark.operators.web import (
        classify_blocks,
        escape_html_text,
        html_blocks,
    )

    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><nav><a href="/">Home</a></nav><p>'),
        escape_html_text(F.col("text")),
        F.lit("</p>" + _FARM_HTML + '<p>see <a href="/r">ref '),
        did.cast("string"),
        F.lit("</a> for more details about this topic here</p></body></html>"),
    )
    d = (
        T(spark, sf, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", html.alias("html"))
    )
    return classify_blocks(html_blocks(d))


def _seed_url(doc_id):
    return F.concat(
        F.lit("https://site"), (doc_id % 40).cast("string"),
        F.lit(".example.com/articles/"), doc_id.cast("string"),
        F.lit("?page="), (doc_id % 7).cast("string"),
    )


_SEED_SQL = ("'https://site' || (doc_id % 40) || '.example.com/articles/' || doc_id"
             " || '?page=' || (doc_id % 7)")


@register(
    "web_link_graph",
    "G4,A1",
    rf"""
    WITH d AS (SELECT doc_id, doc_id % 40 AS h FROM documents)
    SELECT doc_id, '/top/t' || (doc_id % 11) AS href,
           'https://site' || h || '.example.com/top/t' || (doc_id % 11) AS url_canon
    FROM d
    UNION ALL
    SELECT doc_id, '../other/' || (doc_id % 13) || '.html',
           'https://site' || h || '.example.com/other/' || (doc_id % 13) || '.html'
    FROM d
    UNION ALL
    SELECT doc_id, '//cdn' || (doc_id % 5) || '.example.org/img/' || doc_id,
           'https://cdn' || (doc_id % 5) || '.example.org/img/' || doc_id
    FROM d
    UNION ALL
    SELECT doc_id, '?page=' || ((doc_id + 1) % 7),
           'https://site' || h || '.example.com/articles/' || doc_id
             || '?page=' || ((doc_id + 1) % 7)
    FROM d
    UNION ALL
    SELECT doc_id,
           'HTTPS://SITE' || ((doc_id + 1) % 40) || '.EXAMPLE.COM:443/articles/'
             || (doc_id + 1) || '#x',
           'https://site' || ((doc_id + 1) % 40) || '.example.com/articles/'
             || (doc_id + 1)
    FROM d
    """,
    doc="link-graph edge extraction (r10): per doc, a codegen fixture "
    "page with one out-link of every RFC 3986 resolution kind "
    "(root-relative, dotted relative, scheme-relative, query-only, "
    "absolute-with-junk), extracted by the quote-aware anchor scanner, "
    "resolved against the page's base URL (strict §5.2 incl. "
    "dot-segment removal) and canonicalized — the crawl-frontier "
    "projection.  Oracle recomputes all five resolved canonical edges "
    "in closed form.  Plan: one codegen synth + one Arrow kernel + "
    "explode, shuffle-free; operators/web.py resolve_url/link_edges",
)
def web_link_graph(spark, sf):
    from esgopeta_spark.operators.web import link_edges

    did = F.col("doc_id")
    html = F.concat(
        F.lit('<p><a href="/top/t'), (did % 11).cast("string"),
        F.lit('">a</a><a href="../other/'), (did % 13).cast("string"),
        F.lit('.html">b</a><a href="//cdn'), (did % 5).cast("string"),
        F.lit(".example.org/img/"), did.cast("string"),
        F.lit('">c</a><a href="?page='), ((did + 1) % 7).cast("string"),
        F.lit('">d</a><a href="HTTPS://SITE'), ((did + 1) % 40).cast("string"),
        F.lit(".EXAMPLE.COM:443/articles/"), (did + 1).cast("string"),
        F.lit('#x">e</a></p>'),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("base_url"), html.alias("html")
    )
    return link_edges(d)


def _warc_oracle():
    from esgopeta_spark.operators.web import synth_html_sql

    return f"""
    WITH p AS (
      SELECT doc_id, {synth_html_sql()} AS page FROM documents
    )
    SELECT doc_id, 'response' AS rec_type,
           {_SEED_SQL} AS uri,
           CAST(octet_length(encode(page)) AS BIGINT) AS content_length,
           md5(page) AS payload_md5
    FROM p
    """


@register(
    "web_warc_extract",
    "G4,E1",
    _warc_oracle(),
    doc="WARC record framing round trip (r10 — the Common Crawl "
    "container, ISO 28500): per doc, frame the fixture page's UTF-8 "
    "bytes as a WARC/1.0 response record (encoder twin), then parse the "
    "blob back — declared Content-Length framing, binary-safe payloads "
    "(never scanned for markers), header map, record terminator.  The "
    "oracle reconstructs the page string byte-identically from the "
    "shared literal chunks (synth_html_sql) and takes octet_length + "
    "md5 of it, so a single flipped payload byte anywhere in the "
    "build->frame->parse->hash chain mismatches.  Malformed blobs "
    "quarantine to a visible error row.  Plan: two Arrow kernels over "
    "one scan, shuffle-free; operators/web.py build_warc_record/"
    "parse_warc",
)
def web_warc_extract(spark, sf):
    from esgopeta_spark.operators.web import synth_html, warc_build, warc_extract

    did = F.col("doc_id")
    d = T(spark, sf, "documents").select(
        "doc_id",
        _seed_url(did).alias("uri"),
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("html"),
    )
    return warc_extract(warc_build(d))


@register(
    "web_warc_route",
    "G4,G5,E1",
    rf"""
    WITH c AS (
      SELECT doc_id,
             trim(regexp_replace(coalesce(text, ''), '[ \t\n\r\f\v]+', ' ', 'g')) AS t,
             length(coalesce(text, '')) AS n
      FROM documents
    )
    SELECT doc_id,
           {_SEED_SQL} AS uri,
           CASE doc_id % 4 WHEN 0 THEN 'html' WHEN 1 THEN 'png'
                           WHEN 2 THEN 'wav' ELSE 'pdf' END AS kind,
           CAST(CASE WHEN doc_id % 8 = 0 THEN 200 ELSE 0 END AS INTEGER) AS status,
           CAST(CASE doc_id % 4
                WHEN 0 THEN 36 + length(CAST(doc_id AS VARCHAR))
                            + CASE WHEN t = '' THEN 0 ELSE length(t) + 1 END
                            + length(CAST(n AS VARCHAR))
                WHEN 1 THEN (3 + doc_id % 5) * (2 + doc_id % 7)
                WHEN 2 THEN 500 + (doc_id % 11) * 16
                ELSE 18 + length(CAST(doc_id AS VARCHAR))
                        + length(CAST(n AS VARCHAR))
                        + CASE WHEN n > 0 THEN n + 1 ELSE 0 END
                END AS BIGINT) AS stat
    FROM c
    """,
    doc="content-type routing over a mixed WARC corpus (r10; pdf r11): "
    "each parsed record's payload is first unwrapped as the HTTP "
    "message a response record really stores (status line + headers + "
    "body, de-chunked — every eighth fixture doc ships the full "
    "HTTP/1.1 envelope), then the BODY is sniffed on bytes (a crawler "
    "cannot trust Content-Type) and routed to the matching from-scratch "
    "decoder — html -> the extraction kernel (stat = clean-text "
    "chars), png -> image decode (stat = w*h), wav -> audio decode "
    "(stat = n_samples), pdf -> the bounded PDF parser (stat = "
    "extracted chars, closed form 18 + digits + text+1) — the "
    "crawl-side fan-in to the media codec stack.  Poison payloads "
    "quarantine per-record.  Plan: two Arrow kernels over one scan, "
    "shuffle-free; operators/web.py parse_http_response/sniff_payload/"
    "warc_route + operators/pdf.py extract_pdf_text",
)
def web_warc_route(spark, sf):
    from esgopeta_spark.operators.web import synth_html, synth_mixed_warc, warc_route

    did = F.col("doc_id")
    d = T(spark, sf, "documents").select(
        "doc_id",
        _seed_url(did).alias("uri"),
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("html"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    return warc_route(synth_mixed_warc(d))


_ROBOTS_EVEN = (
    "# fixture robots\n"
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/pub\n"
    "Disallow: /articles/*7$\n"
)
_ROBOTS_ODD = (
    "User-agent: esgopeta\n"
    "Disallow: /articles/\n"
    "\n"
    "User-agent: *\n"
    "Disallow:\n"
)


@register(
    "web_robots_filter",
    "G4",
    r"""
    SELECT doc_id,
           'site' || (doc_id % 40) || '.example.com' AS host,
           '/articles/' || doc_id AS path,
           CAST(CASE WHEN (doc_id % 40) % 2 = 1 THEN 0
                     WHEN doc_id % 10 = 7 THEN 0
                     ELSE 1 END AS INTEGER) AS allowed
    FROM documents
    """,
    doc="robots.txt crawl-frontier gate (r10, RFC 9309): per host a "
    "fixture robots file — even hosts give every agent a wildcard+"
    "anchor rule battery (Disallow /articles/*7$ so article ids ending "
    "in 7 are blocked), odd hosts block this crawler's SPECIFIC agent "
    "group while allowing everyone else (longest-agent-match grouping) "
    "— evaluated by the real parser/matcher (group selection, "
    "longest-pattern precedence, Allow tie-break, '*'/'$' patterns, "
    "comments, empty-Disallow).  Oracle recomputes the verdict in "
    "closed form from the id arithmetic.  Plan: one Arrow kernel with "
    "a per-batch parsed-rules cache, shuffle-free; operators/web.py "
    "parse_robots/robots_allows",
)
def web_robots_filter(spark, sf):
    from esgopeta_spark.operators.web import robots_filter

    did = F.col("doc_id")
    h = did % 40
    d = T(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("site"), h.cast("string"), F.lit(".example.com")).alias("host"),
        F.concat(F.lit("/articles/"), did.cast("string")).alias("path"),
        F.when(h % 2 == 0, F.lit(_ROBOTS_EVEN)).otherwise(F.lit(_ROBOTS_ODD)).alias("robots"),
    )
    return robots_filter(d).drop("robots")


@register(
    "web_crawl_schedule",
    "G4,E5",
    r"""
    WITH f AS (
      SELECT doc_id,
             'site' || (doc_id % 40) || '.example.com' AS host,
             'https://site' || (doc_id % 40) || '.example.com/articles/' || doc_id
               || '?page=' || (doc_id % 7) AS url_canon
      FROM documents
    ), r AS (
      SELECT doc_id, host, url_canon,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY url_canon, doc_id) AS rn
      FROM f
    )
    SELECT doc_id, host, url_canon,
           CAST((rn - 1) // 4 AS BIGINT) AS fetch_wave,
           CAST((rn - 1) % 4 AS INTEGER) AS slot
    FROM r
    """,
    doc="per-host politeness scheduling (r10 — the step after the "
    "frontier): a crawler may hold at most K=4 in-flight fetches per "
    "host, so frontier URLs get a deterministic (fetch_wave, slot) by "
    "dense per-host rank in (url, id) order — wave w fetches the "
    "host's URLs 4w..4w+3.  Pure codegen: one window shuffle keyed by "
    "host (at 100 TB the frontier partitions BY HOST anyway for "
    "connection reuse, so the window rides the natural partitioning; "
    "skewed mega-hosts are bounded because each host's wave count is "
    "its URL count / K, trivially spillable).  Oracle runs the same "
    "rank arithmetic",
)
def web_crawl_schedule(spark, sf):
    from pyspark.sql.window import Window

    did = F.col("doc_id")
    f = T(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("site"), (did % 40).cast("string"), F.lit(".example.com")).alias("host"),
        _seed_url(did).alias("url_canon"),
    )
    w = Window.partitionBy("host").orderBy(F.col("url_canon").asc(), F.col("doc_id").asc())
    rn = F.row_number().over(w) - 1
    return f.select(
        "doc_id", "host", "url_canon",
        (rn / 4).cast("bigint").alias("fetch_wave"),
        (rn % 4).cast("int").alias("slot"),
    )


@register(
    "web_cdx_index",
    "G4,E1,E5",
    r"""
    WITH p AS (
      SELECT doc_id, doc_id // 4 AS grp,
             'https://site' || (doc_id % 40) || '.example.com/articles/' || doc_id
               || '?page=' || (doc_id % 7) AS uri,
             'com,example,site' || (doc_id % 40) || ')/articles/' || doc_id
               || '?page=' || (doc_id % 7) AS urlkey,
             octet_length(encode('<html><head><title>Doc ' || doc_id || '</title><meta charset="utf-8"><script type="text/javascript">var s = "</div> <p>not text</p>"; if (1 < 2) { s += "&amp;"; }</script><style>p > a { color: #fff; }</style></head><body><nav><ul><li><a href="/">Home</a></li><li><a href="/about?a=1&amp;b=2">About</a></li></ul></nav><!-- boilerplate <p>comment</p> --><div id="main" data-note="a > b"><p>' || replace(replace(replace(coalesce(text, ''), '&', '&amp;'), '<', '&lt;'), '>', '&gt;') || '</p><p>Q&amp;A &mdash; caf&eacute; &#8364;5 &lt;em&gt; &#x263A; &copy;</p><p>Length: ' || length(coalesce(text, '')) || '</p></div><footer>&copy; 2026 Example &middot; <a href="#terms">Terms</a></footer></body></html>')) AS paylen
      FROM documents
    ), r AS (
      SELECT doc_id, grp, uri, urlkey,
             CAST(74 + length(uri) + length(CAST(paylen AS VARCHAR)) + paylen
                  AS BIGINT) AS reclen
      FROM p
    )
    SELECT grp, urlkey, uri,
           CAST(SUM(reclen) OVER (PARTITION BY grp ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - reclen
                AS BIGINT) AS offset,
           reclen
    FROM r
    """,
    doc="CDX-style archive index (r10 — the seekable index Common Crawl "
    "publishes next to every .warc.gz): four docs' response records "
    "concatenate into one WARC blob per group (EVEN groups compressed "
    "as per-record gzip members, the .warc.gz layout — gzip_members "
    "splits them; offsets index the decompressed stream so both "
    "layouts share one closed form), then one kernel emits (urlkey = "
    "SURT of the canonical URI, uri, offset, reclen) per record.  The "
    "oracle recomputes record sizes from the framing arithmetic "
    "(74 + len(uri) + content-length digits + payload bytes) and "
    "offsets as a per-group running sum.  Plan: one (grp) groupBy + "
    "two kernels, no join; operators/web.py "
    "surt_key/gzip_members/cdx_index",
)
def web_cdx_index(spark, sf):
    from esgopeta_spark.operators.web import (
        build_warc_record,
        cdx_index,
        gzip_record,
        synth_html,
    )

    did = F.col("doc_id")
    d = T(spark, sf, "documents").select(
        "doc_id",
        F.expr("doc_id div 4").alias("grp"),
        _seed_url(did).alias("uri"),
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("html"),
    )
    g = d.groupBy("grp").agg(
        F.sort_array(
            F.collect_list(F.struct("doc_id", "uri", "html"))
        ).alias("ms")
    )

    @F.pandas_udf("binary")
    def _build(grp: pd.Series, ms: pd.Series) -> pd.Series:
        out = []
        for gv, members in zip(grp, ms):
            recs = [
                build_warc_record(m["uri"], m["html"].encode("utf-8"))
                for m in members
            ]
            if int(gv) % 2 == 0:  # .warc.gz layout: one gzip member per record
                out.append(b"".join(gzip_record(r) for r in recs))
            else:
                out.append(b"".join(recs))
        return pd.Series(out)

    return cdx_index(g.select("grp", _build(F.col("grp"), F.col("ms")).alias("warc")))


# closed-form n_chars of the two text-document residue classes of the
# id%4 mixed-warc fixture: html (the pipeline_html_to_shards form) and
# pdf (18 fixed chars: 'Doc '=4 + 3 joining newlines + 'Length: '=8 +
# 'End.'=4 − 1 trailing... = 'Doc '+id+NL [+text+NL] +'Length: '+n+NL
# +'End.' = 4+1+8+1+4 = 18 + digit widths + text+1 when non-empty)
_CRAWL_SHARDS_SQL = r"""
    WITH c AS (
      SELECT doc_id,
             trim(regexp_replace(coalesce(text, ''), '[ \t\n\r\f\v]+', ' ', 'g')) AS t,
             length(coalesce(text, '')) AS n
      FROM documents
    ), ext AS (
      SELECT doc_id,
             CAST(36 + length(CAST(doc_id AS VARCHAR))
                  + CASE WHEN t = '' THEN 0 ELSE length(t) + 1 END
                  + length(CAST(n AS VARCHAR)) AS BIGINT) AS n_chars
      FROM c WHERE doc_id % 4 = 0
      UNION ALL
      SELECT doc_id,
             CAST(18 + length(CAST(doc_id AS VARCHAR))
                  + length(CAST(n AS VARCHAR))
                  + CASE WHEN n > 0 THEN n + 1 ELSE 0 END AS BIGINT)
      FROM c WHERE doc_id % 4 = 3
    ), gated AS (
      SELECT doc_id, n_chars FROM ext WHERE n_chars >= 160
    ), s AS (
      SELECT doc_id, n_chars,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) AS BIGINT) AS d1,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))
                  AS UBIGINT) AS BIGINT) AS d2
      FROM gated
    ), a AS (
      SELECT doc_id, n_chars,
             CASE WHEN d1 < 3435973836 THEN 'train'
                  WHEN d1 < 3865470566 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(d2 % 8 AS INTEGER) AS shard
      FROM s
    )
    SELECT split, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM a GROUP BY split, shard
"""


@register(
    "pipeline_crawl_to_shards",
    "G4,G5,E5",
    _CRAWL_SHARDS_SQL,
    doc="the FULL crawl-to-writer capstone in ONE Catalyst lineage "
    "(r10; pdf r11): mixed .warc bytes (html every fourth doc, every "
    "eighth HTTP/1.1-wrapped; png/wav/PDF otherwise) -> record parse + "
    "HTTP unwrap + byte sniff + text extraction in one kernel — html "
    "via the extraction kernel AND pdf via the bounded from-scratch "
    "PDF parser (non-document records drop) -> length gate -> "
    "deterministic md5 split/shard -> per (split, shard) rollup.  Raw "
    "crawl bytes become writer-sharded training text in a single plan; "
    "the oracle unions the html and pdf closed forms over their "
    "residue classes.  Plan: two Arrow kernels + codegen gate/split + "
    "one final shuffle; operators/web.py warc_doc_text + "
    "operators/pdf.py + operators/text.py split_shards",
)
def pipeline_crawl_to_shards(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions
    from esgopeta_spark.operators.text import split_shards
    from esgopeta_spark.operators.web import (
        synth_html,
        synth_mixed_warc,
        warc_doc_text,
    )

    did = F.col("doc_id")
    d = ensure_min_partitions(  # r13: widen the single-row-group scan
        T(spark, sf, "documents")).select(
        "doc_id",
        _seed_url(did).alias("uri"),
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("html"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    texts = warc_doc_text(synth_mixed_warc(d))
    ext = texts.select(
        "doc_id", F.length("clean_text").cast("bigint").alias("n_chars")
    )
    gated = ext.filter(F.col("n_chars") >= 160)
    sharded = split_shards(gated)
    return sharded.groupBy("split", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "web_redirect_resolve",
    "G1,G4",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h, 1 + doc_id % 4 AS L FROM documents
    ), k AS (
      SELECT doc_id, h, L, 0 AS k FROM b
      UNION ALL SELECT doc_id, h, L, 1 FROM b WHERE L > 1
      UNION ALL SELECT doc_id, h, L, 2 FROM b WHERE L > 2
      UNION ALL SELECT doc_id, h, L, 3 FROM b WHERE L > 3
    )
    SELECT 'https://site' || h || '.example.com/r/' || doc_id || '/' || k AS src_url,
           'https://site' || h || '.example.com/r/' || doc_id || '/final' AS final_url,
           CAST(L - k AS BIGINT) AS hops,
           CAST(1 AS INTEGER) AS resolved
    FROM k
    UNION ALL
    SELECT 'https://site' || (doc_id % 40) || '.example.com/r/' || doc_id
             || '/c' || c.c,
           '', CAST(-1 AS BIGINT), CAST(0 AS INTEGER)
    FROM documents, (SELECT 0 AS c UNION ALL SELECT 1) c
    WHERE doc_id % 5 = 0
    """,
    doc="HTTP redirect resolution + chain collapse (r11, verdict #4 — "
    "real WARCs are ~20-30% redirects): per doc, synthesize a WARC "
    "blob holding a 301 chain of length 1+id%4 whose Location headers "
    "alternate absolute-uppercase-host/:443, absolute-path, and bare "
    "relative forms (plus a 302 two-cycle for id%5==0), then run the "
    "REAL chain — WARC parse -> HTTP unwrap -> 3xx Location -> RFC "
    "3986 resolve against the record URI -> canonicalize -> "
    "pointer-doubling collapse (ceil(log2(max_hops)) url-equi "
    "self-joins, localCheckpoint per round).  Every src maps to its "
    "final target with its hop count; cycles/over-cap chains emit a "
    "VISIBLE marker row (final='', hops=-1, resolved=0), never a "
    "silent drop.  Oracle recomputes every (src, final, hops) in "
    "closed form from the id arithmetic.  Plan: one Arrow kernel + 3 "
    "equi self-joins on the canonical url key — the partitioning a "
    "100 TB redirect table has anyway; operators/web.py "
    "warc_redirect_edges/collapse_redirects",
)
def web_redirect_resolve(spark, sf):
    from esgopeta_spark.operators.web import (
        collapse_redirects,
        synth_redirect_warc,
        warc_redirect_edges,
    )

    # r14 (optimization): A/B'd a scan widening here and REVERTED it —
    # the WARC synth/parse kernels are light per row, and the clean
    # interleaved probe read serial 1.56 s vs widened 2.11 s (the
    # exchange + extra kernel-stage scheduling cost more than the
    # serial compute; contrast text_pdf_extract, where the kernel is
    # heavy and the same widening won 4.7x).
    d = T(spark, sf, "documents").select("doc_id")
    edges = warc_redirect_edges(synth_redirect_warc(d))
    return collapse_redirects(edges)


@register(
    "text_pdf_extract",
    "G4,G5",
    r"""
    WITH c AS (
      SELECT doc_id, coalesce(text, '') AS t, length(coalesce(text, '')) AS n
      FROM documents
    )
    SELECT doc_id,
           'Doc ' || doc_id || chr(10)
           || CASE WHEN t = '' THEN '' ELSE t || chr(10) END
           || 'Length: ' || n || chr(10) || 'End.' AS pdf_text,
           CAST(CASE WHEN t = '' THEN 3 ELSE 4 END AS INTEGER) AS n_lines,
           CAST(2 AS INTEGER) AS n_pages
    FROM c
    """,
    doc="crawl front-end: bounded from-scratch PDF text extraction "
    "(r11, verdict #1 — the second-largest text format in real crawl "
    "corpora): synthesize a deterministic two-page fixture PDF per doc "
    "in an encoder-twin Arrow kernel (real xref table, page tree, "
    "escaped literal strings; page-1 content stream FlateDecode-"
    "compressed via stdlib zlib for even ids, page 2 under an INDIRECT "
    "/Length with a TJ array and an ' operator), then run the REAL "
    "parser: xref walk, object model, filter decode, page-tree "
    "recursion, BT/ET text-operator interpretation (strings verbatim — "
    "unlike html, PDF strings ARE the typeset text).  Oracle "
    "recomputes the expected extraction in closed form from "
    "documents.text.  Plan: two Arrow kernels over one scan, "
    "shuffle-free; operators/pdf.py build_pdf/extract_pdf_text",
)
def text_pdf_extract(spark, sf):
    from esgopeta_spark.operators.pdf import pdf_extract, synth_pdf
    from esgopeta_spark.session import ensure_min_partitions

    # r13: widen the single-row-group scan so the per-row PDF
    # build+extract kernels parallelize (the serial-scan artifact the
    # r13 sf1* probe exposed; a no-op on real multi-split inputs)
    d = ensure_min_partitions(T(spark, sf, "documents")).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    return pdf_extract(synth_pdf(d))


@register(
    "text_pdf_font_remap",
    "G4,G5",
    r"""
    WITH c AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    )
    SELECT doc_id,
           'Doc ' || doc_id || chr(10)
           || CASE WHEN t = '' THEN '' ELSE t || chr(10) END
           || 'CID: ' || t || chr(10) || 'End.' AS pdf_text,
           CAST(CASE WHEN t = '' THEN 3 ELSE 4 END AS INTEGER) AS n_lines,
           CAST(2 AS INTEGER) AS n_pages
    FROM c
    """,
    doc="PDF real-corpus FONT fidelity (r12, verdict #3): the fixture "
    "PDF shows page 1 through a /Differences-remapped Type1 font "
    "(every letter rot13'd, every digit +5 IN THE CONTENT BYTES — a "
    "reader ignoring the /Encoding dict returns mojibake, never "
    "silently passes) and page 2 through a Type0 /Identity-H font "
    "with 2-byte codes and a /ToUnicode CMap (offset-form bfrange + "
    "a multi-char bfchar); /Resources inherit from the /Pages node. "
    "Extraction must walk the font tables to recover the corpus text; "
    "oracle recomputes the expected text in closed form from "
    "documents.text.  Plan: two Arrow kernels over one scan, "
    "shuffle-free; operators/pdf.py build_pdf_fontmapped/_font_decoder",
)
def text_pdf_font_remap(spark, sf):
    from esgopeta_spark.operators.pdf import pdf_extract, synth_pdf_fontmapped
    from esgopeta_spark.session import ensure_min_partitions

    # r13: widen the single-row-group scan so the per-row PDF
    # build+extract kernels parallelize (the serial-scan artifact the
    # r13 sf1* probe exposed; a no-op on real multi-split inputs)
    d = ensure_min_partitions(T(spark, sf, "documents")).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    return pdf_extract(synth_pdf_fontmapped(d))


@register(
    "text_pdf_filters",
    "G4,G5",
    r"""
    WITH c AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    )
    SELECT doc_id,
           'Doc ' || doc_id || chr(10)
           || CASE WHEN t = '' THEN '' ELSE t || chr(10) END
           || 'Filter: ' || (doc_id % 5) AS pdf_text,
           CAST(CASE WHEN t = '' THEN 2 ELSE 3 END AS INTEGER) AS n_lines,
           CAST(1 AS INTEGER) AS n_pages
    FROM c
    """,
    doc="PDF stream-filter matrix (r13, r12 verdict #2/missing-list: "
    "LZWDecode serves pre-2002 PDFs and several generators' content "
    "streams — previously those records quarantined and the text was "
    "lost): per doc the fixture's content stream is encoded by class "
    "id%5 — LZWDecode (the TIFF section-13 codec REUSED from "
    "codecs.py), LZWDecode under /EarlyChange 0 (deferred width "
    "bump), RunLengthDecode (PackBits + EOD), ASCII85Decode (z-group, "
    "~> EOD), and the two-stage /Filter [/ASCII85Decode /LZWDecode] "
    "chain — then the REAL extractor must decode it to recover the "
    "corpus text.  Oracle recomputes the expected extraction in "
    "closed form from documents.text.  Plan: two Arrow kernels over "
    "one scan, shuffle-free; operators/pdf.py "
    "build_pdf_filtered/stream_data",
)
def text_pdf_filters(spark, sf):
    from esgopeta_spark.operators.pdf import pdf_extract, synth_pdf_filtered
    from esgopeta_spark.session import ensure_min_partitions

    # r13: widen the single-row-group scan so the per-row PDF
    # build+extract kernels parallelize (the serial-scan artifact the
    # r13 sf1* probe exposed; a no-op on real multi-split inputs)
    d = ensure_min_partitions(T(spark, sf, "documents")).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    return pdf_extract(synth_pdf_filtered(d))


@register(
    "web_url_features",
    "G4",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h, doc_id % 7 AS pg,
             doc_id % 5 AS extra
      FROM documents
    )
    SELECT doc_id,
           'https://site' || h || '.example.com/articles/sec-' || extra
             || '-rev/' || doc_id || CASE WHEN extra = 0 THEN '/' ELSE '' END
             || '?page=' || pg
             || CASE WHEN doc_id % 3 = 0 THEN '&session=' || doc_id * 7919
                ELSE '' END AS url_canon,
           CAST(length('/articles/sec-' || extra || '-rev/' || doc_id
                || CASE WHEN extra = 0 THEN '/' ELSE '' END) AS INTEGER) AS path_len,
           CAST(CASE WHEN extra = 0 THEN 4 ELSE 3 END AS INTEGER) AS path_depth,
           CAST(1 + length(CAST(doc_id AS VARCHAR)) AS INTEGER) AS path_digits,
           CAST(2 AS INTEGER) AS path_hyphens,
           CAST(length('page=' || pg)
                + CASE WHEN doc_id % 3 = 0
                  THEN length('&session=' || doc_id * 7919) ELSE 0 END
                AS INTEGER) AS query_len,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER) AS n_params
    FROM b
    """,
    doc="URL-shape quality features (r11 — the RefinedWeb/fineweb "
    "curation signals computed BEFORE any content model: path "
    "depth/length, digit count in the path — session-id/paginated "
    "sludge — hyphenated-slug count, query length and param count), "
    "ALL pure codegen over the canonical url, no kernel, no shuffle.  "
    "Fixture urls vary depth (trailing slash), digits (the id + "
    "session param for every third doc) and hyphens; the oracle "
    "recomputes every feature in closed form.  Plan: one scan + one "
    "codegen projection; operators/web.py url_features",
)
def web_url_features(spark, sf):
    from esgopeta_spark.operators.web import url_features

    did = F.col("doc_id")
    h = (did % 40).cast("string")
    extra = (did % 5).cast("string")
    url = F.concat(
        F.lit("https://site"), h, F.lit(".example.com/articles/sec-"), extra,
        F.lit("-rev/"), did.cast("string"),
        F.when(did % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?page="), (did % 7).cast("string"),
        F.when(did % 3 == 0,
               F.concat(F.lit("&session="), (did * 7919).cast("string")))
        .otherwise(F.lit("")),
    )
    d = T(spark, sf, "documents").select("doc_id", url.alias("url_canon"))
    return url_features(d)


@register(
    "pipeline_sitemap_recursion",
    "G4",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h,
             lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
             lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT 'https://site' || h || '.example.com/a/' || doc_id || '?x=1' AS loc,
           'page' AS kind, '2024-' || mm || '-' || dd AS lastmod,
           CAST((doc_id % 10) * 100 AS INTEGER) AS priority_milli,
           CAST(1 AS INTEGER) AS depth
    FROM b
    UNION ALL
    SELECT 'https://site' || h || '.example.com/b/' || doc_id,
           'page', '', CAST(500 AS INTEGER), CAST(1 AS INTEGER)
    FROM b
    UNION ALL
    SELECT 'https://site' || h || '.example.com/sm/' || doc_id || '/missing.xml',
           'unfetched', '', CAST(-1 AS INTEGER), CAST(2 AS INTEGER)
    FROM b
    UNION ALL
    SELECT 'https://site' || h || '.example.com/sm/' || doc_id || '/4.xml',
           'depth-capped', '', CAST(-1 AS INTEGER), CAST(3 AS INTEGER)
    FROM b
    """,
    doc="recursive sitemap-index expansion (r11 — real site sitemaps "
    "are index TREES, sometimes cyclic, sometimes dangling): per "
    "id%5==0 doc the fixture store holds a root <sitemapindex> (one "
    "child listed uppercase+:443 so canonicalization must fold it), a "
    "<urlset> child with two pages, a second index child listing a "
    "grandchild index, a MISSING sitemap, and the ROOT AGAIN (the "
    "cycle), and a great-grandchild beyond the depth cap.  "
    "expand_sitemap_frontier walks it: pages emit with the parse-round "
    "depth; the missing child emits a VISIBLE 'unfetched' marker; the "
    "over-cap child a VISIBLE 'depth-capped' marker; the cycle dedups "
    "against the seen set (no row — not new work).  The SEEDS come "
    "from the fixture's robots.txt Sitemap: directives (the "
    "sitemaps.org discovery path — robots.txt is where real crawlers "
    "find a site's sitemaps; duplicate directives dedup, comments "
    "strip).  Oracle recomputes all four row classes in closed form.  "
    "Plan: one seed kernel, then max_depth+1 bounded rounds, each ONE "
    "url-equi store join + one Arrow parse kernel, frontier/seen "
    "localCheckpointed per round; operators/web.py "
    "robots_sitemaps/expand_sitemap_frontier",
)
def pipeline_sitemap_recursion(spark, sf):
    from esgopeta_spark.operators.web import (
        expand_sitemap_frontier,
        robots_sitemap_seeds,
    )

    did = F.col("doc_id")
    h = (did % 40).cast("string")
    ds = did.cast("string")
    host = F.concat(F.lit("site"), h, F.lit(".example.com"))
    base = F.concat(F.lit("https://"), host, F.lit("/sm/"), ds, F.lit("/"))
    mm = F.lpad(((did % 12) + 1).cast("string"), 2, "0")
    dd = F.lpad(((did % 28) + 1).cast("string"), 2, "0")
    pri = (did % 10).cast("string")
    sm = lambda loc: F.concat(F.lit("<sitemap><loc>"), loc, F.lit("</loc></sitemap>"))  # noqa: E731
    root_xml = F.concat(
        F.lit("<sitemapindex>"),
        sm(F.concat(F.lit("HTTPS://SITE"), h, F.lit(".EXAMPLE.COM:443/sm/"), ds, F.lit("/1.xml"))),
        sm(F.concat(base, F.lit("2.xml"))),
        F.lit("</sitemapindex>"),
    )
    c1_xml = F.concat(
        F.lit("<urlset><url><loc>https://"), host, F.lit("/a/"), ds,
        F.lit("?x=1</loc><lastmod>2024-"), mm, F.lit("-"), dd,
        F.lit("</lastmod><priority>0."), pri,
        F.lit("</priority></url><url><loc>https://"), host, F.lit("/b/"), ds,
        F.lit("</loc></url></urlset>"),
    )
    c2_xml = F.concat(
        F.lit("<sitemapindex>"),
        sm(F.concat(base, F.lit("3.xml"))),
        sm(F.concat(base, F.lit("missing.xml"))),
        sm(F.concat(base, F.lit("root.xml"))),  # the cycle
        F.lit("</sitemapindex>"),
    )
    c3_xml = F.concat(
        F.lit("<sitemapindex>"), sm(F.concat(base, F.lit("4.xml"))),
        F.lit("</sitemapindex>"),
    )
    c4_xml = F.concat(
        F.lit("<urlset><url><loc>https://"), host, F.lit("/never/"), ds,
        F.lit("</loc></url></urlset>"),
    )
    d = T(spark, sf, "documents").filter(did % 5 == 0)
    store = d.select(
        F.explode(
            F.array(
                F.struct(F.concat(base, F.lit("root.xml")).alias("url"), root_xml.alias("xml")),
                F.struct(F.concat(base, F.lit("1.xml")).alias("url"), c1_xml.alias("xml")),
                F.struct(F.concat(base, F.lit("2.xml")).alias("url"), c2_xml.alias("xml")),
                F.struct(F.concat(base, F.lit("3.xml")).alias("url"), c3_xml.alias("xml")),
                F.struct(F.concat(base, F.lit("4.xml")).alias("url"), c4_xml.alias("xml")),
            )
        ).alias("s")
    ).select("s.url", "s.xml")
    robots = F.concat(
        F.lit("# corpus robots\nUser-agent: *\nDisallow: /private/\n"
              "Sitemap: "),
        base, F.lit("root.xml\n# a comment line\nSITEMAP: "),
        base, F.lit("root.xml\n"),  # duplicate directive: seeds dedup
    )
    seeds = robots_sitemap_seeds(d.select(robots.alias("robots")))
    return expand_sitemap_frontier(seeds, store, max_depth=2)


_MONTH_NAMES = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


@register(
    "web_revalidation_plan",
    "G4",
    r"""
    WITH b AS (SELECT doc_id, doc_id % 12 AS mm, doc_id % 28 + 1 AS dd
               FROM documents WHERE doc_id % 5 <> 4)
    SELECT doc_id,
           'https://site' || (doc_id % 40) || '.example.com/articles/' || doc_id
             AS url_canon,
           CASE WHEN doc_id % 3 = 0 THEN '"v' || doc_id || '"' ELSE '' END AS etag,
           CASE WHEN doc_id % 3 = 2 THEN ''
                ELSE '2024-' || lpad(CAST(mm + 1 AS VARCHAR), 2, '0')
                       || '-' || lpad(CAST(dd AS VARCHAR), 2, '0') END
             AS last_modified,
           CASE doc_id % 3 WHEN 0 THEN 'if-none-match'
                WHEN 1 THEN 'if-modified-since'
                ELSE 'unconditional' END AS mode
    FROM b
    """,
    doc="HTTP revalidation planning (r11 — the recrawl loop's bandwidth "
    "saver: a 304 costs headers, a 200 costs the body): per fixture "
    "doc, a WARC 200 response whose cache validators vary by residue "
    "(ETag + Last-Modified / Last-Modified only / neither; every fifth "
    "doc a 404 that must drop), parsed by the REAL chain — WARC -> "
    "HTTP unwrap -> header extraction -> RFC 9110 strongest-validator "
    "choice (If-None-Match beats If-Modified-Since) with RFC-822 dates "
    "normalized through the shared feed month table.  Oracle "
    "recomputes every field in closed form.  Plan: one synth + one "
    "parse Arrow kernel over one scan, shuffle-free; operators/web.py "
    "warc_revalidation_plan",
)
def web_revalidation_plan(spark, sf):
    from esgopeta_spark.operators.web import build_warc_record, warc_revalidation_plan

    @F.pandas_udf("binary")
    def _synth(did: pd.Series) -> pd.Series:
        out = []
        for i in did:
            i = int(i)
            uri = f"https://site{i % 40}.example.com/articles/{i}"
            if i % 5 == 4:
                payload = b"HTTP/1.1 404 Not Found\r\nContent-Length: 0\r\n\r\n"
            else:
                hdrs = ""
                if i % 3 == 0:
                    hdrs += f'ETag: "v{i}"\r\n'
                if i % 3 != 2:
                    mon = _MONTH_NAMES[i % 12]
                    hdrs += (f"Last-Modified: Wed, {i % 28 + 1:02d} {mon} 2024 "
                             "10:00:00 GMT\r\n")
                payload = (
                    "HTTP/1.1 200 OK\r\n" + hdrs + "Server: fixture\r\n\r\nbody"
                ).encode("ascii")
            out.append(build_warc_record(uri, payload))
        return pd.Series(out)

    d = T(spark, sf, "documents").select(
        "doc_id", _synth(F.col("doc_id")).alias("warc")
    )
    return warc_revalidation_plan(d)


@register(
    "web_politeness_delay",
    "G4",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h FROM documents
    ), d AS (
      SELECT doc_id, h,
             'https://site' || h || '.example.com/articles/' || doc_id AS url,
             CAST(CASE h % 3 WHEN 0 THEN (h % 7) * 1000
                  WHEN 1 THEN (h % 7) * 1000 + 250
                  ELSE 0 END AS BIGINT) AS delay_milli
      FROM b
    ), r AS (
      SELECT doc_id, h, url, delay_milli,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY url, doc_id) AS rn
      FROM d
    )
    SELECT doc_id, 'site' || h || '.example.com' AS host, url AS url_canon,
           delay_milli,
           CAST((rn - 1) * delay_milli AS BIGINT) AS next_fetch_milli
    FROM r
    """,
    doc="Crawl-delay politeness scheduling (r11): per-host robots.txt "
    "fixtures carry integer, fractional ('N.25' — parsed digit-wise to "
    "milli, never through a float), and absent Crawl-delay directives; "
    "the REAL parser extracts the agent group's delay and the schedule "
    "spaces each host's fetches by it (next_fetch = wave * delay).  "
    "Oracle recomputes delay and spacing in closed form.  Plan: one "
    "Arrow parse kernel (per-batch rules cache — 40 distinct robots "
    "files) + exactly ONE shuffle, the host-keyed schedule window; "
    "operators/web.py crawl_delay_milli/robots_delay",
)
def web_politeness_delay(spark, sf):
    from pyspark.sql.window import Window

    from esgopeta_spark.operators.web import robots_delay

    h = F.col("doc_id") % 40
    robots = F.concat(
        F.lit("# fixture\nUser-agent: esgopeta\n"),
        F.when(h % 3 == 0, F.concat(F.lit("Crawl-delay: "), (h % 7).cast("string"), F.lit("\n")))
        .when(h % 3 == 1, F.concat(F.lit("Crawl-delay: "), (h % 7).cast("string"), F.lit(".25\n")))
        .otherwise(F.lit("")),
        F.lit("Disallow: /private/\n"),
    )
    d = T(spark, sf, "documents").select(
        "doc_id",
        F.concat(F.lit("site"), h.cast("string"), F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://site"), h.cast("string"), F.lit(".example.com/articles/"),
            F.col("doc_id").cast("string"),
        ).alias("url_canon"),
        robots.alias("robots"),
    )
    withd = robots_delay(d).drop("robots")
    w = Window.partitionBy("host").orderBy(F.col("url_canon").asc(), F.col("doc_id").asc())
    rn = F.row_number().over(w) - 1
    return withd.select(
        "doc_id", "host", "url_canon", "delay_milli",
        (rn * F.col("delay_milli")).cast("bigint").alias("next_fetch_milli"),
    )


@register(
    "text_pdf_metadata",
    "G4,G5",
    r"""
    WITH c AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    )
    SELECT doc_id,
           'Doc ' || doc_id
             || CASE WHEN t = '' THEN ''
                ELSE ': ' || array_to_string(list_slice(string_split(t, ' '), 1, 4), ' ')
                END AS title,
           'corpus' AS author,
           '2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                   || '-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS created,
           CAST(2 AS INTEGER) AS n_pages
    FROM c
    """,
    doc="PDF document metadata (r11 second wave — the provenance fields "
    "a corpus pipeline mines: titles for dedup keys, dates for "
    "freshness): the fixture PDFs carry a trailer /Info dictionary "
    "(classic layout: a second xref SUBSECTION; modern layout: packed "
    "in the ObjStm and referenced from the xref STREAM dict), and "
    "extract_pdf_info walks trailer -> /Info -> Title/Author/"
    "CreationDate with the D:YYYYMMDD date normalized to YYYY-MM-DD "
    "(the feed-date discipline).  Oracle recomputes every field in "
    "closed form from documents.text + id arithmetic.  Plan: two Arrow "
    "kernels over one scan, shuffle-free; operators/pdf.py "
    "extract_pdf_info",
)
def text_pdf_metadata(spark, sf):
    from esgopeta_spark.operators.pdf import pdf_info, synth_pdf

    d = T(spark, sf, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    return pdf_info(synth_pdf(d))


@register(
    "text_unicode_nfc",
    "G4",
    r"""
    WITH f AS (
      SELECT doc_id,
             'Cafe' || chr(769) || ' ' || coalesce(text, '') || ' A'
               || chr(778) || ' ne' || chr(769) || 'e' AS raw
      FROM documents
    )
    SELECT doc_id, nfc_normalize(raw) AS nfc_text,
           CAST(length(raw) AS BIGINT) AS n_before,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_after
    FROM f
    """,
    doc="Unicode NFC normalization (r10, UAX #15) — run before any "
    "fingerprint/dedup so composed and decomposed forms hash "
    "identically.  The fixture plants combining acute/ring sequences "
    "around the corpus text; the Spark side normalizes with Python's "
    "unicodedata, the oracle with DuckDB's ICU nfc_normalize — two "
    "INDEPENDENT UAX #15 implementations must agree byte-for-byte "
    "(restricted to stable Latin combining sequences, so Unicode "
    "version drift cannot split them).  Plan: one Arrow kernel, "
    "shuffle-free; operators/text.py unicode_nfc",
)
def text_unicode_nfc(spark, sf):
    from esgopeta_spark.operators.text import unicode_nfc

    raw = F.concat(
        F.lit("Cafe\u0301 "),  # decomposed: e + combining acute
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" A\u030a ne\u0301e"),  # A + ring, e + acute
    )
    d = T(spark, sf, "documents").select("doc_id", raw.alias("raw"))
    return d.select(
        "doc_id",
        unicode_nfc(F.col("raw")).alias("nfc_text"),
        F.length("raw").cast("bigint").alias("n_before"),
        F.length(unicode_nfc(F.col("raw"))).cast("bigint").alias("n_after"),
    )


@register(
    "text_fold_accents",
    "G1,G4",
    r"""
    WITH f AS (
      SELECT doc_id,
             'Cre' || chr(768) || 'me BRU' || chr(770) || 'LE' || chr(769)
               || 'E ' || coalesce(text, '') || ' n' || chr(771) || 'ono '
               || chr(223) || ' ' || chr(248) AS raw
      FROM documents
    )
    SELECT doc_id, lower(strip_accents(raw)) AS folded,
           CAST(length(raw) AS BIGINT) AS n_before,
           CAST(length(lower(strip_accents(raw))) AS BIGINT) AS n_after
    FROM f
    """,
    doc="accent-fold dedup keys (r10): NFD-decompose + drop combining "
    "marks + lowercase, so 'Crème Brûlée' and 'creme brulee' share one "
    "exact-dedup key — the multilingual companion to text_unicode_nfc, "
    "with the same independent-implementation oracle shape: Python's "
    "unicodedata NFD walk vs DuckDB's ICU strip_accents must agree "
    "byte-for-byte (fixture plants decomposed combining sequences AND "
    "the non-decomposable pass-through cases ss/oe).  Plan: one Arrow "
    "kernel, shuffle-free; operators/text.py fold_accents",
)
def text_fold_accents(spark, sf):
    from esgopeta_spark.operators.text import fold_accents

    raw = F.concat(
        F.lit("Cre\u0300me BRU\u0302LE\u0301E "),  # decomposed grave/circumflex/acute
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" n\u0303ono \u00df \u00f8"),  # combining tilde; ss/oe stay
    )
    d = T(spark, sf, "documents").select("doc_id", raw.alias("raw"))
    return d.select(
        "doc_id",
        fold_accents(F.col("raw")).alias("folded"),
        F.length("raw").cast("bigint").alias("n_before"),
        F.length(fold_accents(F.col("raw"))).cast("bigint").alias("n_after"),
    )


@register(
    "web_host_profile",
    "G4,E4",
    r"""
    WITH d AS (
      SELECT 'site' || (doc_id % 40) || '.example.com' AS host,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      FROM documents
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT norm) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN len(string_split(norm, ' ')) >= 40
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
           CAST(SUM(len(string_split(norm, ' '))) AS BIGINT) AS sum_words
    FROM d GROUP BY host
    """,
    doc="per-host corpus statistics (r10): doc count, distinct "
    "normalized texts (the intra-host dup signal), long-doc count and "
    "token volume per host — the aggregate every web pipeline computes "
    "to drop whole spam/boilerplate domains before per-doc filtering "
    "(CCNet/RefinedWeb-style domain triage).  Plan: one codegen "
    "projection + one partial-aggregated groupBy on host (the crawl's "
    "natural key); the distinct-text count is host-keyed, never "
    "global",
)
def web_host_profile(spark, sf):
    from esgopeta_spark.operators.dedup import normalize_text

    did = F.col("doc_id")
    d = T(spark, sf, "documents").select(
        F.concat(F.lit("site"), (did % 40).cast("string"), F.lit(".example.com")).alias("host"),
        normalize_text(F.col("text")).alias("norm"),
    )
    words = F.size(F.split(F.col("norm"), " "))
    return d.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("norm").cast("bigint").alias("n_unique"),
        F.sum(F.when(words >= 40, 1).otherwise(0)).cast("bigint").alias("n_long"),
        F.sum(words).cast("bigint").alias("sum_words"),
    )


# --- sitemaps (late-r10): the frontier's seed source ------------------------


@register(
    "web_sitemap_extract",
    "G4",
    r"""
    WITH b AS (
      SELECT doc_id,
             doc_id % 40 AS h, doc_id % 7 AS pg,
             lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
             lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd,
             doc_id % 10 AS pr
      FROM documents
    ), e AS (
      SELECT doc_id, 0 AS ord, 'sitemap' AS kind,
             'https://site' || h || '.example.com/sitemap1.xml' AS loc,
             '2024-' || mm || '-' || dd AS lastmod, 500 AS priority_milli
      FROM b WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, 1, 'sitemap',
             'https://site' || h || '.example.com/sitemap2.xml', '', 500
      FROM b WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, 0, 'url',
             'HTTPS://SITE' || h || '.EXAMPLE.COM:443/articles/' || doc_id
               || '?page=' || pg || '&ref=sm',
             '2024-' || mm || '-' || dd, pr * 100
      FROM b WHERE doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, 1, 'url',
             'https://site' || h || '.example.com/a/' || doc_id, '', 500
      FROM b WHERE doc_id % 5 <> 0
    )
    SELECT doc_id, CAST(ord AS INTEGER) AS ord, kind, loc, lastmod,
           CAST(priority_milli AS INTEGER) AS priority_milli
    FROM e
    """,
    doc="sitemap.xml parsing (late-r10, sitemaps.org protocol — the "
    "frontier's seed source completing robots+scheduling): synthesize a "
    "fixture sitemap per doc in codegen (docs with id%5==0 a "
    "<sitemapindex>, others a <urlset> with an entity-escaped loc, "
    "lastmod, decimal priority, plus a bare whitespace-padded loc), "
    "then run the REAL scanning parser: case-insensitive url/sitemap "
    "blocks, loc entity-decode+trim, lastmod leading YYYY-MM-DD, "
    "priority parsed digit-wise to integer milli (never through a "
    "float), protocol defaults.  Oracle recomputes every parsed field "
    "in closed form from the id arithmetic (encoder-twin pattern).  "
    "Plan: one codegen synth + one Arrow kernel + posexplode, "
    "shuffle-free; operators/web.py parse_sitemap",
)
def web_sitemap_extract(spark, sf):
    from esgopeta_spark.operators.web import sitemap_entries, synth_sitemap

    d = T(spark, sf, "documents").select(
        "doc_id", synth_sitemap(F.col("doc_id")).alias("sitemap_xml")
    )
    return (
        sitemap_entries(d)
        .select("doc_id", F.posexplode("entries").alias("ord", "ent"))
        .select(
            "doc_id",
            F.col("ord").cast("int").alias("ord"),
            F.col("ent.kind").alias("kind"),
            F.col("ent.loc").alias("loc"),
            F.col("ent.lastmod").alias("lastmod"),
            F.col("ent.priority_milli").alias("priority_milli"),
        )
    )


@register(
    "pipeline_crawl_frontier",
    "G4,E5",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h, doc_id % 7 AS pg
      FROM documents WHERE doc_id % 5 <> 0
    ), u AS (
      SELECT doc_id, 'site' || h || '.example.com' AS host,
             'https://site' || h || '.example.com/articles/' || doc_id
               || '?page=' || pg || '&ref=sm' AS url_canon
      FROM b WHERE h % 2 = 0 AND doc_id % 10 <> 7
      UNION ALL
      SELECT doc_id, 'site' || h || '.example.com',
             'https://site' || h || '.example.com/a/' || doc_id
               || CASE WHEN doc_id % 10 = 3 THEN '/final' ELSE '' END
      FROM b
    ), r AS (
      SELECT doc_id, host, url_canon,
             ROW_NUMBER() OVER (PARTITION BY host
                                ORDER BY url_canon, doc_id) AS rn
      FROM u
    )
    SELECT doc_id, host, url_canon,
           CAST((rn - 1) // 4 AS BIGINT) AS fetch_wave,
           CAST((rn - 1) % 4 AS INTEGER) AS slot
    FROM r
    """,
    doc="fused crawl FRONTIER pipeline (late-r10; redirect collapse "
    "r11): sitemap parse -> url entries -> canonicalization (the "
    "synth's uppercase scheme/host + :443 + entity-escaped query must "
    "collapse to the closed-form canonical) -> REDIRECT COLLAPSE "
    "(docs with id%10==3 root a two-hop 301 chain at their /a/ url; "
    "the real WARC->HTTP->Location->resolve->pointer-doubling map "
    "rewrites the frontier entry to the chain's final target — a "
    "frontier that fetches a known redirect wastes its politeness "
    "slot) -> RFC 9309 robots gate on the host/path of the EFFECTIVE "
    "url -> per-host politeness (fetch_wave, slot), ONE lineage.  The "
    "discovery half of the crawl loop, joining pipeline_crawl_to_shards "
    "(the ingest half).  Plan: synth + Arrow kernels + explode, one "
    "url-equi left join against the collapsed map, then exactly one "
    "wide shuffle — the host-keyed schedule window, the frontier's "
    "natural 100 TB partitioning; operators/web.py parse_sitemap/"
    "canonicalize_url/collapse_redirects/robots_allows",
)
def pipeline_crawl_frontier(spark, sf):
    from pyspark.sql.window import Window

    from esgopeta_spark.operators.web import (
        collapse_redirects,
        robots_filter,
        sitemap_entries,
        synth_frontier_redirect_warc,
        synth_sitemap,
        url_canonicalize,
        warc_redirect_edges,
    )

    did = F.col("doc_id")
    # r14 (optimization): A/B'd scan widenings here and REVERTED them —
    # the sitemap/WARC kernels are light per row; the clean interleaved
    # probe read serial 2.69 s vs widened 3.64 s (same verdict as
    # web_redirect_resolve; the widening only pays for HEAVY kernels).
    d = T(spark, sf, "documents").select(
        "doc_id", synth_sitemap(did).alias("sitemap_xml")
    )
    urls = (
        sitemap_entries(d)
        .select("doc_id", F.explode("entries").alias("ent"))
        .filter(F.col("ent.kind") == "url")
        .select("doc_id", F.col("ent.loc").alias("url"))
    )
    heads = T(spark, sf, "documents").filter(did % 10 == 3).select("doc_id")
    rmap = (
        collapse_redirects(warc_redirect_edges(synth_frontier_redirect_warc(heads)))
        .filter(F.col("resolved") == 1)
        .select(F.col("src_url").alias("_redir_src"),
                F.col("final_url").alias("_redir_final"))
    )
    canon = url_canonicalize(urls)
    eff = (
        canon.join(rmap, canon["url_canon"] == rmap["_redir_src"], "left")
        .select(
            "doc_id",
            F.coalesce("_redir_final", "url_canon").alias("url_canon"),
        )
    )
    u = eff.select(
        "doc_id",
        "url_canon",
        F.regexp_extract("url_canon", r"^[a-z]+://([^/]+)", 1).alias("host"),
        F.regexp_extract("url_canon", r"^[a-z]+://[^/]+([^?#]*)", 1).alias("path"),
        F.when((F.col("doc_id") % 40) % 2 == 0, F.lit(_ROBOTS_EVEN))
        .otherwise(F.lit(_ROBOTS_ODD))
        .alias("robots"),
    )
    allowed = (
        robots_filter(u)
        .filter(F.col("allowed") == 1)
        .select("doc_id", "host", "url_canon")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("url_canon").asc(), F.col("doc_id").asc()
    )
    rn = F.row_number().over(w) - 1
    return allowed.select(
        "doc_id",
        "host",
        "url_canon",
        (rn / 4).cast("bigint").alias("fetch_wave"),
        (rn % 4).cast("int").alias("slot"),
    )


@register(
    "web_anchor_profile",
    "G4,E4",
    r"""
    WITH d AS (
      SELECT doc_id, doc_id % 40 AS h, doc_id % 11 AS k, doc_id % 13 AS m
      FROM documents
    ), e AS (
      SELECT doc_id,
             'https://site' || h || '.example.com/top/t' || k AS url_canon,
             CASE WHEN doc_id % 2 = 0 THEN 'Topic ' || k || ' guide'
                  ELSE 'Topic ' || k || ' q&a' END AS atext
      FROM d
      UNION ALL
      SELECT doc_id,
             'https://site' || h || '.example.com/other/' || m || '.html',
             'other ' || m
      FROM d
    ), prof AS (
      SELECT url_canon,
             CAST(count(*) AS BIGINT) AS n_links,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_src,
             CAST(sum(CASE WHEN atext = '' THEN 0
                           ELSE len(string_split(atext, ' ')) END) AS BIGINT)
               AS anchor_tokens
      FROM e GROUP BY url_canon
    ), tops AS (
      SELECT url_canon, atext, count(*) AS c FROM e GROUP BY url_canon, atext
    ), top1 AS (
      SELECT url_canon, atext AS top_anchor,
             ROW_NUMBER() OVER (PARTITION BY url_canon
                                ORDER BY c DESC, atext ASC) AS rn
      FROM tops
    )
    SELECT prof.url_canon, prof.n_links, prof.n_src, prof.anchor_tokens,
           top1.top_anchor
    FROM prof JOIN top1 USING (url_canon) WHERE top1.rn = 1
    """,
    doc="per-target anchor-text profiles (late-r10) — the classic web "
    "relevance/quality signal (in-degree + what the web CALLS a page): "
    "synthesize a fixture page per doc whose two anchors carry nested "
    "tags, an entity (&amp;), raw whitespace, and a parity-split text "
    "variant; run the REAL anchor scanner (href multiplicity identical "
    "to extract_links, inner text tag-stripped/entity-decoded/"
    "collapsed), resolve+canonicalize each edge, then aggregate per "
    "target: in-link count, distinct sources, total anchor tokens, "
    "modal anchor text (count DESC, text ASC).  Oracle rebuilds the "
    "edge table from the id arithmetic in closed form and aggregates "
    "identically.  Plan: one kernel explode localCheckpointed once "
    "(dual-consumer lesson), both aggregates + the modal window keyed "
    "by url_canon; operators/web.py extract_anchors/"
    "anchor_target_profile",
)
def web_anchor_profile(spark, sf):
    from esgopeta_spark.operators.web import anchor_edges, anchor_target_profile

    did = F.col("doc_id")
    k = (did % 11).cast("string")
    m = (did % 13).cast("string")
    html = F.concat(
        F.lit('<div><a href="/top/t'), k, F.lit('">Topic <b>'), k,
        F.when(did % 2 == 0, F.lit("</b> guide")).otherwise(
            F.lit("</b>\n q&amp;a")
        ),
        F.lit('</a><a href="../other/'), m,
        F.lit('.html">  other\n '), m, F.lit(" </a></div>"),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("base_url"), html.alias("html")
    )
    return anchor_target_profile(anchor_edges(d)).select(
        "url_canon", "n_links", "n_src", "anchor_tokens", "top_anchor"
    )


@register(
    "web_image_captions",
    "G4,G5",
    r"""
    WITH d AS (
      SELECT doc_id, doc_id % 40 AS h, doc_id % 9 AS r, doc_id % 7 AS m
      FROM documents
    )
    SELECT doc_id,
           'https://site' || h || '.example.com/img/' || doc_id
             || '.png?s=2&v=1' AS img_url,
           'Red fox ' || r AS alt,
           CAST(3 AS INTEGER) AS alt_tokens
    FROM d
    UNION ALL
    SELECT doc_id,
           'https://site' || h || '.example.com/articles/thumb/' || m || '.jpg',
           'small icon',
           CAST(2 AS INTEGER)
    FROM d WHERE doc_id % 2 = 0
    """,
    doc="image-caption pair harvest (late-r10, the LAION-shaped "
    "multimodal curation stage): synthesize a fixture page per doc "
    "with three <img> tags — entity-escaped query src + raw-whitespace "
    "alt, a relative src with a parity-split short alt, a scheme-"
    "relative src with NO alt — run the REAL quote-aware img scanner, "
    "resolve+canonicalize each src against the page base, and apply "
    "the caption gate (alt_tokens >= 2: the no-alt and 1-token pairs "
    "drop — too short to supervise).  Oracle recomputes the surviving "
    "(img_url, alt, alt_tokens) pairs in closed form from the id "
    "arithmetic.  Plan: one codegen synth + one Arrow kernel + "
    "explode + fused codegen gate, shuffle-free; operators/web.py "
    "extract_image_refs/image_caption_pairs",
)
def web_image_captions(spark, sf):
    from esgopeta_spark.operators.web import image_caption_pairs

    did = F.col("doc_id")
    r = (did % 9).cast("string")
    m = (did % 7).cast("string")
    c = (did % 5).cast("string")
    html = F.concat(
        F.lit('<figure><img src="/img/'), did.cast("string"),
        F.lit('.png?v=1&amp;s=2" alt="Red  fox\n '), r,
        F.lit('"></figure><img alt="'),
        F.when(did % 2 == 0, F.lit("small icon")).otherwise(F.lit("icon")),
        F.lit('" src="thumb/'), m,
        F.lit('.jpg"><img src="//cdn'), c,
        F.lit(".example.org/i/"), did.cast("string"), F.lit('.webp">'),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("base_url"), html.alias("html")
    )
    return image_caption_pairs(d, min_alt_tokens=2)


@register(
    "pipeline_multimodal_pairs",
    "G4,G5",
    r"""
    WITH b AS (
      SELECT doc_id,
             doc_id % 40 AS h40,
             3 + doc_id % 5 AS w,
             2 + doc_id % 7 AS ht,
             doc_id % 240 AS c
      FROM documents
    )
    SELECT doc_id,
           'https://site' || h40 || '.example.com/img/' || doc_id || '.png'
             AS img_url,
           'fig ' || (doc_id % 9) || ' caption' AS alt,
           CAST(w AS INTEGER) AS width,
           CAST(ht AS INTEGER) AS height,
           CAST(w * ht * c + ht * (w * (w - 1)) // 2
                + w * (ht * (ht - 1)) // 2 AS BIGINT) AS px_sum
    FROM b
    """,
    doc="multimodal curation capstone (late-r10): raw WARC bytes -> "
    "(caption, decoded image) training pairs — per doc the fixture "
    "blob frames TWO records (the html page whose <img> points at the "
    "image, and the PNG itself at that url), then the REAL chain runs: "
    "WARC parse -> HTTP unwrap -> byte sniff -> html records through "
    "the img scanner (src resolved against the RECORD uri, "
    "canonicalized) / image records through the from-scratch PNG "
    "decoder (width/height/int64 pixel sum) -> url-equi join = the "
    "LAION-shaped pair table.  Pixels are (x + y + id%240), bounded "
    "<256, so the oracle recomputes the decoded pixel sum in closed "
    "form: w*h*c + h*C(w,2) + w*C(h,2).  Plan: one kernel "
    "localCheckpointed once feeding both join sides, one url-equi "
    "hash join, no cartesian; operators/web.py caption_media_pairs",
)
def pipeline_multimodal_pairs(spark, sf):
    import numpy as np

    from esgopeta_spark.operators import codecs
    from esgopeta_spark.operators.web import build_warc_record, caption_media_pairs

    @F.pandas_udf("binary")
    def _synth(did: pd.Series) -> pd.Series:
        out = []
        for i in did:
            i = int(i)
            h40, w, ht, c = i % 40, 3 + i % 5, 2 + i % 7, i % 240
            page_uri = (
                f"https://site{h40}.example.com/articles/{i}?page={i % 7}"
            )
            img_uri = f"https://site{h40}.example.com/img/{i}.png"
            html = (
                f"<!DOCTYPE html><p>doc {i}</p>"
                f'<img src="/img/{i}.png" alt="fig {i % 9} caption">'
            ).encode("utf-8")
            y, x = np.mgrid[0:ht, 0:w]
            png = codecs.encode_png((x + y + c).astype(np.uint8))
            out.append(
                build_warc_record(page_uri, html)
                + build_warc_record(img_uri, png)
            )
        return pd.Series(out)

    d = T(spark, sf, "documents").select(
        "doc_id", _synth(F.col("doc_id")).alias("warc")
    )
    return caption_media_pairs(d)


@register(
    "web_charset_route",
    "G4",
    r"""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'windows-1252'
                           WHEN 1 THEN 'utf-16'
                           ELSE 'utf-8-sig' END AS enc,
           'café ' || doc_id || ' — naïve' AS clean_text,
           CAST(length('café ' || doc_id || ' — naïve') AS BIGINT) AS n_chars
    FROM documents
    """,
    doc="charset-sniffed decode through the crawl chain (late-r10, the "
    "HTML5 prescan): the SAME non-ASCII page per doc is framed as a "
    "WARC record in one of three wire encodings by id%3 — "
    "windows-1252 declared only by <meta charset=latin-1> (the WHATWG "
    "alias), utf-16 declared only by its BOM (NUL-interleaved markup; "
    "the r10 sniffer reads it through the BOM), utf-8-sig (BOM + "
    "meta) — and every variant must decode to the IDENTICAL clean "
    "text; a missed charset turns the accents into replacement chars "
    "and the hash fails.  Oracle is the expected text in closed form.  "
    "Plan: one synth kernel + the warc_html_text kernel, shuffle-free; "
    "operators/web.py sniff_charset/decode_html_bytes",
)
def web_charset_route(spark, sf):
    from esgopeta_spark.operators.web import build_warc_record, warc_html_text

    @F.pandas_udf("binary")
    def _synth(did: pd.Series) -> pd.Series:
        out = []
        for i in did:
            i = int(i)
            body = f"café {i} — naïve"
            if i % 3 == 0:
                page = (
                    '<!DOCTYPE html><meta charset="latin-1">'
                    f"<p>{body}</p>"
                ).encode("windows-1252")
            elif i % 3 == 1:
                page = f"<!DOCTYPE html><p>{body}</p>".encode("utf-16")
            else:
                page = (
                    '<!DOCTYPE html><meta charset="utf-8">'
                    f"<p>{body}</p>"
                ).encode("utf-8-sig")
            out.append(
                build_warc_record(f"https://site{i % 40}.example.com/c/{i}", page)
            )
        return pd.Series(out)

    d = T(spark, sf, "documents").select(
        "doc_id", _synth(F.col("doc_id")).alias("warc")
    )
    did = F.col("doc_id")
    return warc_html_text(d).select(
        "doc_id",
        F.when(did % 3 == 0, F.lit("windows-1252"))
        .when(did % 3 == 1, F.lit("utf-16"))
        .otherwise(F.lit("utf-8-sig"))
        .alias("enc"),
        "clean_text",
        F.length("clean_text").cast("bigint").alias("n_chars"),
    )


@register(
    "web_feed_extract",
    "G4",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h,
             lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
             lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
      FROM documents
    ), e AS (
      SELECT doc_id, 0 AS ord, 'rss' AS kind,
             'Post ' || doc_id || ' & more' AS title,
             'https://site' || h || '.example.com/articles/' || doc_id AS link,
             '2024-' || mm || '-' || dd AS published
      FROM b WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, 1, 'rss', 'second post',
             'https://site' || h || '.example.com/a/' || doc_id, ''
      FROM b WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, 0, 'atom', 'Entry ' || doc_id,
             'https://site' || h || '.example.com/articles/' || doc_id,
             '2024-' || mm || '-' || dd
      FROM b WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id, 1, 'atom', 'alt', '/a/' || doc_id, ''
      FROM b WHERE doc_id % 2 = 1
    )
    SELECT doc_id, CAST(ord AS INTEGER) AS ord, kind, title, link, published
    FROM e
    """,
    doc="RSS 2.0 / Atom feed parsing (late-r10 — the discovery trio's "
    "third leg beside sitemaps and the link graph): even docs "
    "synthesize an RSS channel (entity-escaped title, text <link>, "
    "RFC 822 pubDate mapped through the month table, a dateless "
    "whitespace-padded second item, a linkless item that must drop), "
    "odd docs an Atom feed (<link href> attribute form incl. a "
    "rel=alternate relative href, ISO updated).  The REAL scanning "
    "parser normalizes every date to YYYY-MM-DD; the oracle recomputes "
    "all fields in closed form from the id arithmetic.  Plan: one "
    "codegen synth + one Arrow kernel + posexplode, shuffle-free; "
    "operators/web.py parse_feed",
)
def web_feed_extract(spark, sf):
    from esgopeta_spark.operators.web import feed_entries

    did = F.col("doc_id")
    sid = (did % 40).cast("string")
    ds = did.cast("string")
    mm = F.lpad(((did % 12) + 1).cast("string"), 2, "0")
    dd = F.lpad(((did % 28) + 1).cast("string"), 2, "0")
    mon = F.element_at(
        F.array(*[F.lit(m) for m in
                  ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                   "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]]),
        ((did % 12) + 1).cast("int"),
    )
    rss = F.concat(
        F.lit("<rss><channel>\n <item><title>Post "), ds,
        F.lit(" &amp; more</title><link>https://site"), sid,
        F.lit(".example.com/articles/"), ds,
        F.lit("</link><pubDate>Tue, "), dd, F.lit(" "), mon,
        F.lit(" 2024 09:30:00 GMT</pubDate></item>\n <item><title> second  "
              "post </title><link>https://site"), sid,
        F.lit(".example.com/a/"), ds,
        F.lit("</link></item>\n <item><title>no link</title></item>\n"
              "</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom">\n <entry><title>'
              "Entry "), ds,
        F.lit('</title><link href="https://site'), sid,
        F.lit(".example.com/articles/"), ds,
        F.lit('"/><updated>2024-'), mm, F.lit("-"), dd,
        F.lit('T09:30:00Z</updated></entry>\n <entry><title>alt</title>'
              '<link rel="alternate" href="/a/'), ds,
        F.lit('"/></entry>\n</feed>'),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", F.when(did % 2 == 0, rss).otherwise(atom).alias("feed_xml")
    )
    return (
        feed_entries(d)
        .select("doc_id", F.posexplode("entries").alias("ord", "ent"))
        .select(
            "doc_id",
            F.col("ord").cast("int").alias("ord"),
            F.col("ent.kind").alias("kind"),
            F.col("ent.title").alias("title"),
            F.col("ent.link").alias("link"),
            F.col("ent.published").alias("published"),
        )
    )


@register(
    "web_recrawl_schedule",
    "G4,E5",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h,
             lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
             lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
      FROM documents
    ), e AS (
      SELECT doc_id, 'site' || h || '.example.com' AS host,
             'https://site' || h || '.example.com/articles/' || doc_id AS link,
             CAST(date_diff('day', CAST('2024-' || mm || '-' || dd AS DATE),
                            DATE '2025-01-01') AS BIGINT) AS stale_days
      FROM b
      UNION ALL
      SELECT doc_id, 'site' || h || '.example.com',
             'https://site' || h || '.example.com/a/' || doc_id,
             CAST(9999 AS BIGINT)
      FROM b WHERE doc_id % 2 = 0
    ), r AS (
      SELECT doc_id, host, link, stale_days,
             ROW_NUMBER() OVER (PARTITION BY host
                                ORDER BY stale_days DESC, link ASC) AS rn
      FROM e
    )
    SELECT doc_id, host, link, stale_days,
           CAST((rn - 1) // 4 AS BIGINT) AS fetch_wave,
           CAST((rn - 1) % 4 AS INTEGER) AS slot
    FROM r
    """,
    doc="freshness-aware recrawl scheduling (late-r10 — the frontier "
    "policy that closes the crawl loop): parse the fixture feeds with "
    "the REAL parser, keep absolute links, compute integer staleness "
    "days against the fixed corpus reference date 2025-01-01 (dateless "
    "entries = never-seen discoveries = staleness 9999, crawled "
    "first), then per-host politeness waves ordered most-stale-first "
    "(stale DESC, link ASC — unique total order).  Calendar arithmetic "
    "is exact in both engines, so the oracle recomputes staleness from "
    "the same closed-form dates.  Plan: one Arrow parse kernel + "
    "explode, then exactly one shuffle — the host-keyed window, the "
    "frontier's natural partitioning; operators/web.py parse_feed",
)
def web_recrawl_schedule(spark, sf):
    from pyspark.sql.window import Window

    from esgopeta_spark.operators.web import feed_entries

    did = F.col("doc_id")
    sid = (did % 40).cast("string")
    ds = did.cast("string")
    mm = F.lpad(((did % 12) + 1).cast("string"), 2, "0")
    dd = F.lpad(((did % 28) + 1).cast("string"), 2, "0")
    rss = F.concat(
        F.lit("<rss><channel><item><title>p</title><link>https://site"), sid,
        F.lit(".example.com/articles/"), ds,
        F.lit("</link><pubDate>2024-"), mm, F.lit("-"), dd,
        F.lit("</pubDate></item><item><title>n</title><link>https://site"),
        sid, F.lit(".example.com/a/"), ds,
        F.lit("</link></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed><entry><title>e</title><link href="https://site'), sid,
        F.lit(".example.com/articles/"), ds,
        F.lit('"/><updated>2024-'), mm, F.lit("-"), dd,
        F.lit("T09:30:00Z</updated></entry></feed>"),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", F.when(did % 2 == 0, rss).otherwise(atom).alias("feed_xml")
    )
    ents = (
        feed_entries(d)
        .select("doc_id", F.explode("entries").alias("ent"))
        .select(
            "doc_id",
            F.col("ent.link").alias("link"),
            F.col("ent.published").alias("published"),
        )
        .filter(F.col("link").startswith("https://"))
    )
    e = ents.select(
        "doc_id",
        F.regexp_extract("link", r"^https://([^/]+)", 1).alias("host"),
        "link",
        F.when(F.col("published") == "", F.lit(9999))
        .otherwise(F.datediff(F.lit("2025-01-01"), F.col("published")))
        .cast("bigint")
        .alias("stale_days"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("stale_days").desc(), F.col("link").asc()
    )
    rn = F.row_number().over(w) - 1
    return e.select(
        "doc_id", "host", "link", "stale_days",
        (rn / 4).cast("bigint").alias("fetch_wave"),
        (rn % 4).cast("int").alias("slot"),
    )


@register(
    "pipeline_recrawl_politeness",
    "G4,E5",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h,
             lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
             lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
      FROM documents
    ), e AS (
      SELECT doc_id, h, 'site' || h || '.example.com' AS host,
             'https://site' || h || '.example.com/articles/' || doc_id AS link,
             CAST(date_diff('day', CAST('2024-' || mm || '-' || dd AS DATE),
                            DATE '2025-01-01') AS BIGINT) AS stale_days
      FROM b
      UNION ALL
      SELECT doc_id, h, 'site' || h || '.example.com',
             'https://site' || h || '.example.com/a/' || doc_id,
             CAST(9999 AS BIGINT)
      FROM b WHERE doc_id % 2 = 0
    ), r AS (
      SELECT doc_id, host, link, stale_days,
             CAST(CASE h % 3 WHEN 0 THEN (h % 7) * 1000
                  WHEN 1 THEN (h % 7) * 1000 + 250
                  ELSE 0 END AS BIGINT) AS delay_milli,
             ROW_NUMBER() OVER (PARTITION BY host
                                ORDER BY stale_days DESC, link ASC) AS rn
      FROM e
    )
    SELECT doc_id, host, link, stale_days, delay_milli,
           CAST((rn - 1) // 4 AS BIGINT) AS fetch_wave,
           CAST(((rn - 1) // 4) * delay_milli AS BIGINT) AS next_fetch_milli
    FROM r
    """,
    doc="the full recrawl POLICY in one lineage (r11 capstone of the "
    "second wave): feed parse -> staleness days (dateless = never-seen "
    "= crawled first) -> per-host most-stale-first waves -> each "
    "host's waves SPACED by its own robots.txt Crawl-delay (the REAL "
    "parser against per-host fixtures with integer, fractional, and "
    "absent delays) — next_fetch_milli = fetch_wave * delay_milli, the "
    "actual dispatch timestamp a polite recrawler queues.  Composes "
    "web_recrawl_schedule (freshness) with web_politeness_delay "
    "(spacing); the oracle recomputes staleness, delay, and dispatch "
    "in closed form.  Plan: one feed-parse kernel + one robots-delay "
    "kernel (40-entry rules cache) + exactly ONE shuffle, the "
    "host-keyed window — the frontier's natural partitioning; "
    "operators/web.py parse_feed/crawl_delay_milli",
)
def pipeline_recrawl_politeness(spark, sf):
    from pyspark.sql.window import Window

    from esgopeta_spark.operators.web import feed_entries, robots_delay

    did = F.col("doc_id")
    sid = (did % 40).cast("string")
    ds = did.cast("string")
    mm = F.lpad(((did % 12) + 1).cast("string"), 2, "0")
    dd = F.lpad(((did % 28) + 1).cast("string"), 2, "0")
    rss = F.concat(
        F.lit("<rss><channel><item><title>p</title><link>https://site"), sid,
        F.lit(".example.com/articles/"), ds,
        F.lit("</link><pubDate>2024-"), mm, F.lit("-"), dd,
        F.lit("</pubDate></item><item><title>n</title><link>https://site"),
        sid, F.lit(".example.com/a/"), ds,
        F.lit("</link></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed><entry><title>e</title><link href="https://site'), sid,
        F.lit(".example.com/articles/"), ds,
        F.lit('"/><updated>2024-'), mm, F.lit("-"), dd,
        F.lit("T09:30:00Z</updated></entry></feed>"),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", F.when(did % 2 == 0, rss).otherwise(atom).alias("feed_xml")
    )
    ents = (
        feed_entries(d)
        .select("doc_id", F.explode("entries").alias("ent"))
        .select(
            "doc_id",
            F.col("ent.link").alias("link"),
            F.col("ent.published").alias("published"),
        )
        .filter(F.col("link").startswith("https://"))
    )
    h = F.regexp_extract("link", r"^https://site(\d+)\.", 1).cast("int")
    robots = F.concat(
        F.lit("User-agent: esgopeta\n"),
        F.when(h % 3 == 0, F.concat(F.lit("Crawl-delay: "), (h % 7).cast("string"), F.lit("\n")))
        .when(h % 3 == 1, F.concat(F.lit("Crawl-delay: "), (h % 7).cast("string"), F.lit(".25\n")))
        .otherwise(F.lit("")),
        F.lit("Disallow: /private/\n"),
    )
    e = ents.select(
        "doc_id",
        F.regexp_extract("link", r"^https://([^/]+)", 1).alias("host"),
        "link",
        F.when(F.col("published") == "", F.lit(9999))
        .otherwise(F.datediff(F.lit("2025-01-01"), F.col("published")))
        .cast("bigint")
        .alias("stale_days"),
        robots.alias("robots"),
    )
    e = robots_delay(e).drop("robots")
    w = Window.partitionBy("host").orderBy(
        F.col("stale_days").desc(), F.col("link").asc()
    )
    wave = ((F.row_number().over(w) - 1) / 4).cast("bigint")
    return e.select(
        "doc_id", "host", "link", "stale_days", "delay_milli",
        wave.alias("fetch_wave"),
        (wave * F.col("delay_milli")).cast("bigint").alias("next_fetch_milli"),
    )


def _content_encoding_oracle():
    from esgopeta_spark.operators.web import synth_html_sql

    return rf"""
    WITH p AS (
      SELECT doc_id, {synth_html_sql()} AS page FROM documents
    )
    SELECT doc_id,
           {_SEED_SQL} AS uri,
           CAST(200 AS INTEGER) AS status,
           CASE WHEN doc_id % 4 IN (1, 2) THEN 'deflate' ELSE 'gzip' END
             AS content_encoding,
           md5(page) AS page_md5,
           CAST(length(page) AS BIGINT) AS n_chars
    FROM p
    """


@register(
    "web_content_encoding",
    "G4,E1",
    _content_encoding_oracle(),
    doc="HTTP Content-Encoding unwrap (r11 third wave — ~half of real "
    "crawl responses arrive compressed on the wire, RFC 9110 §8.4.1): "
    "per doc, the encoder twin frames the fixture page as a full "
    "HTTP/1.1 message whose body is gzip (id%4=0), zlib-wrapped "
    "deflate (=1), RAW deflate under a 'deflate' header — the "
    "misconfigured-server interop bug every browser tolerates (=2), or "
    "chunk-framed gzip — Transfer-Encoding layered OUTSIDE "
    "Content-Encoding, the real wire order (=3), inside one WARC "
    "record; then the REAL chain (WARC parse -> HTTP unwrap: de-chunk "
    "-> content-decode -> charset decode) must recover the page string "
    "byte-exactly.  md5+length are over the RECOVERED page, so one "
    "wrong byte in any layer mismatches the closed-form oracle "
    "(synth_html_sql rebuilds the page from shared literal chunks).  "
    "Unknown codings (br/zstd) and corrupt streams quarantine to "
    "visible error rows (pinned in tests/test_web.py).  Plan: two "
    "Arrow kernels over one scan, shuffle-free; stateless "
    "(stream-safe); operators/web.py decode_content_encoding/"
    "http_unwrap_digest",
)
def web_content_encoding(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions
    from esgopeta_spark.operators.web import (
        http_unwrap_digest,
        synth_encoded_warc,
        synth_html,
    )

    did = F.col("doc_id")
    d = ensure_min_partitions(  # r13: widen the single-row-group scan
        T(spark, sf, "documents")).select(
        "doc_id",
        _seed_url(did).alias("uri"),
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("page"),
    )
    return http_unwrap_digest(synth_encoded_warc(d))


def _content_encoding_modern_oracle():
    from esgopeta_spark.operators.web import synth_html_sql

    return rf"""
    WITH p AS (
      SELECT doc_id, {synth_html_sql()} AS page FROM documents
    )
    SELECT doc_id,
           {_SEED_SQL} AS uri,
           CAST(200 AS INTEGER) AS status,
           CASE WHEN doc_id % 2 = 0 THEN 'zstd' ELSE 'br' END
             AS content_encoding,
           md5(page) AS page_md5,
           CAST(length(page) AS BIGINT) AS n_chars
    FROM p
    """


@register(
    "web_content_encoding_modern",
    "G4,E1",
    _content_encoding_modern_oracle(),
    doc="Modern Content-Encoding unwrap (r13 — closes the r12 verdict's "
    "standing missing-list #4: zstd/br responses used to quarantine for "
    "want of a decoder, a growing share of real crawl traffic): per "
    "doc the encoder twin frames the fixture page as a full HTTP/1.1 "
    "message whose body is RFC 8878 zstd (id%4=0), RFC 7932 brotli "
    "(=1), chunk-framed zstd (=2), or chunk-framed brotli (=3), inside "
    "one WARC record; the REAL chain (WARC parse -> de-chunk -> "
    "content-decode -> charset decode) must recover the page "
    "byte-exactly.  zstd decodes through the FROM-SCRATCH RFC 8878 "
    "decoder (operators/zstd.py — FSE, Huffman, sequences, repeat "
    "offsets; conformance-pinned against the in-container libzstd in "
    "tests/test_zstd.py) with pyarrow's C decoder preferred at scale "
    "(byte-equality of the two paths pinned); brotli via pyarrow's "
    "bundled codec (a from-scratch brotli is out of honest scope: the "
    "120 KB static dictionary cannot be retyped verifiably — the B.7 "
    "lesson).  md5+length are over the RECOVERED page, so one wrong "
    "byte anywhere mismatches the closed-form oracle.  Plan: two Arrow "
    "kernels over one scan, shuffle-free; stateless (stream-safe); "
    "operators/web.py decode_content_encoding + operators/zstd.py",
)
def web_content_encoding_modern(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions
    from esgopeta_spark.operators.web import (
        _ENC_CLASSES_MODERN,
        http_unwrap_digest,
        synth_encoded_warc,
        synth_html,
    )

    did = F.col("doc_id")
    d = ensure_min_partitions(  # r13: widen the single-row-group scan
        T(spark, sf, "documents")).select(
        "doc_id",
        _seed_url(did).alias("uri"),
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("page"),
    )
    return http_unwrap_digest(
        synth_encoded_warc(d, classes=_ENC_CLASSES_MODERN)
    )


@register(
    "web_canonical_hints",
    "G1,G4",
    r"""
    WITH b AS (SELECT doc_id, doc_id % 40 AS h FROM documents),
    c AS (
      SELECT doc_id,
        'https://site' || h || '.example.com/articles/' || doc_id
          || '?page=' || (doc_id % 7) AS url_canon,
        CASE WHEN doc_id % 4 = 3
             THEN 'https://site' || h || '.example.com/articles/' || doc_id
                  || '?page=' || (doc_id % 7)
             ELSE 'https://site' || h || '.example.com/canon/c'
                  || (doc_id % 9) || '?v=1' END AS canonical_url,
        CAST(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END AS INTEGER) AS is_self
      FROM b
    )
    SELECT doc_id, url_canon, canonical_url, is_self,
           COUNT(*) OVER (PARTITION BY canonical_url) AS group_size
    FROM c
    """,
    doc="rel=canonical dedup hints (r11 third wave — the SITE-declared "
    "canonical key, RFC 6596; real pipelines fold it into URL-level "
    "dedup beside redirects): per doc a fixture head with a stylesheet "
    "link first (must not match), an adversarial canonical link for "
    "id%4!=3 (uppercase tag/attrs, single quotes, multi-token "
    "rel='alternate CANONICAL', an &amp; entity and a utm_ param in "
    "the href), and a SECOND canonical link that must lose (first "
    "wins, the WHATWG repeated-metadata rule).  The real kernel "
    "extracts, resolves against the page URL, canonicalizes (entity "
    "decode + tracking-param strip verified by the hash), falls back "
    "to self for undeclared pages, and counts each canonical group — "
    "the dedup collapse a 100 TB crawl keys on.  Oracle recomputes "
    "every canonical target and group size in closed form.  Plan: one "
    "Arrow kernel + ONE window shuffle on the canonical key (the "
    "natural partitioning of the dedup that follows); stateless "
    "projection (stream-safe); operators/web.py extract_canonical/"
    "canonical_hints",
)
def web_canonical_hints(spark, sf):
    from pyspark.sql import Window

    from esgopeta_spark.operators.web import canonical_hints

    did = F.col("doc_id")
    canon_link = F.when(
        did % 4 != 3,
        F.concat(
            F.lit("<LINK REL='alternate CANONICAL' HREF='/canon/c"),
            (did % 9).cast("string"),
            F.lit("?v=1&amp;utm_source=fixture'>"
                  '<link rel="canonical" href="/WRONG">'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><link rel="stylesheet" href="/s.css">'),
        canon_link,
        F.lit("</head><body>x</body></html>"),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("url_canon"), html.alias("html")
    )
    out = canonical_hints(d).drop("html")
    return out.select(
        "doc_id", "url_canon", "canonical_url",
        (F.col("canonical_url") == F.col("url_canon"))
        .cast("int").alias("is_self"),
        F.count("*").over(Window.partitionBy("canonical_url"))
        .alias("group_size"),
    )


@register(
    "web_robots_policy",
    "G4,A1",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h, doc_id % 4 AS m FROM documents
    )
    SELECT doc_id, '/f' || (doc_id % 11) AS href,
           'https://site' || h || '.example.com/f' || (doc_id % 11) AS url_canon,
           CAST(0 AS INTEGER) AS anchor_nofollow,
           CAST(CASE WHEN m IN (1, 3) THEN 1 ELSE 0 END AS INTEGER) AS page_noindex,
           CAST(CASE WHEN m IN (2, 3) THEN 1 ELSE 0 END AS INTEGER) AS page_nofollow,
           CAST(CASE WHEN m IN (2, 3) THEN 0 ELSE 1 END AS INTEGER) AS follow
    FROM b
    UNION ALL
    SELECT doc_id, '/n' || (doc_id % 13),
           'https://site' || h || '.example.com/n' || (doc_id % 13),
           CAST(1 AS INTEGER),
           CAST(CASE WHEN m IN (1, 3) THEN 1 ELSE 0 END AS INTEGER),
           CAST(CASE WHEN m IN (2, 3) THEN 1 ELSE 0 END AS INTEGER),
           CAST(0 AS INTEGER)
    FROM b
    """,
    doc="robots META + rel=nofollow link policy (r11 third wave — the "
    "two in-page directives every polite crawler/indexer honors "
    "beside robots.txt): per doc a fixture page whose meta robots "
    "class cycles none-declared / NOINDEX / 'nofollow , x' (case + "
    "whitespace + comma-list) / none (= both), plus a googlebot-scoped "
    "decoy meta that must NOT match, one plain anchor and one "
    "rel='UGC nofollow' anchor (token list, any case).  The real "
    "kernel extracts edges with their anchor flags, unions "
    "most-restrictive across metas, resolves + canonicalizes, and "
    "fuses the frontier-eligibility verdict (follow = page AND anchor "
    "allow).  Oracle recomputes both edges per doc in closed form.  "
    "Plan: one Arrow kernel + explode, shuffle-free; stateless "
    "(stream-safe); operators/web.py meta_robots/extract_links_rel/"
    "policy_link_edges",
)
def web_robots_policy(spark, sf):
    from esgopeta_spark.operators.web import policy_link_edges

    did = F.col("doc_id")
    m = did % 4
    meta = (
        F.when(m == 1, F.lit('<meta name="robots" content="NOINDEX">'))
        .when(m == 2, F.lit("<META NAME='robots' CONTENT='nofollow , x'>"))
        .when(m == 3, F.lit('<meta name="robots" content="none">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit('<html><head><meta name="googlebot" content="noindex">'),
        meta,
        F.lit('</head><body><a href="/f'), (did % 11).cast("string"),
        F.lit('">a</a><a rel="UGC nofollow" href="/n'),
        (did % 13).cast("string"),
        F.lit('">b</a></body></html>'),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("base_url"), html.alias("html")
    )
    return policy_link_edges(d)


@register(
    "web_template_lines",
    "G4,G1,E4",
    r"""
    WITH d AS (
      SELECT doc_id, 'site' || (doc_id % 40) AS host,
             '(c) 2026 site' || (doc_id % 40) || ' - all rights reserved'
             || chr(10) || coalesce(text, '') || chr(10)
             || 'home | about | contact site' || (doc_id % 40) AS t
      FROM documents
    ), l AS (
      SELECT doc_id, host,
             unnest(string_split(t, chr(10))) AS line,
             unnest(range(0, len(string_split(t, chr(10))))) AS pos
      FROM d
    ), hd AS (
      SELECT host, COUNT(*) AS host_docs FROM d GROUP BY host
    ), ld AS (
      SELECT host, line, COUNT(DISTINCT doc_id) AS line_docs
      FROM l GROUP BY host, line
    ), bp AS (
      SELECT ld.host, ld.line
      FROM ld JOIN hd USING (host)
      WHERE line_docs >= 3 AND line_docs * 1000 >= 500 * host_docs
    )
    SELECT l.doc_id, l.host,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE bp.line IS NOT NULL) AS BIGINT)
             AS n_dropped,
           coalesce(string_agg(CASE WHEN bp.line IS NULL THEN l.line END,
                               chr(10) ORDER BY l.pos), '') AS clean_text
    FROM l LEFT JOIN bp ON l.host = bp.host AND l.line = bp.line
    GROUP BY l.doc_id, l.host
    """,
    doc="host-template boilerplate line removal (r11 third wave — the "
    "CCNet-lineage cut per-page extraction cannot make: site furniture "
    "is only visible ACROSS a host's pages): fixture wraps every doc "
    "in a per-host copyright banner and nav-crumb line; a line in "
    ">=50% (integer milli threshold) AND >=3 of a host's docs is "
    "template and is removed from every page, votes counted "
    "per-document.  Corpus-text lines that happen to repeat across a "
    "host (e.g. empty texts) are dropped by the SAME data-driven rule "
    "on both sides — the oracle runs the identical computation, so "
    "the hash proves threshold, vote counting, and line-order "
    "reassembly exactly.  Plan: all codegen (no Python), two shuffles "
    "on the natural keys (host+line aggregate, doc regroup), template "
    "set broadcast back — bounded by template size at any corpus "
    "scale; operators/web.py host_template_lines",
)
def web_template_lines(spark, sf):
    from esgopeta_spark.operators.web import host_template_lines

    did = F.col("doc_id")
    h = (did % 40).cast("string")
    text = F.concat(
        F.lit("(c) 2026 site"), h, F.lit(" - all rights reserved\n"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit("\nhome | about | contact site"), h,
    )
    d = T(spark, sf, "documents").select(
        "doc_id", F.concat(F.lit("site"), h).alias("host"), text.alias("text")
    )
    return host_template_lines(d)


@register(
    "web_pdf_links",
    "G4,A1",
    r"""
    SELECT doc_id, CAST(0 AS INTEGER) AS pos,
           'https://ref' || (doc_id % 9) || '.example.org/p/' || (doc_id % 31)
             AS url,
           'https://ref' || (doc_id % 9) || '.example.org/p/' || (doc_id % 31)
             AS url_canon
    FROM documents
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER),
           'HTTPS://CITE' || (doc_id % 5) || '.EXAMPLE.ORG:443/d/' || doc_id
             || '?utm_source=pdf&x=' || (doc_id % 3),
           'https://cite' || (doc_id % 5) || '.example.org/d/' || doc_id
             || '?x=' || (doc_id % 3)
    FROM documents
    """,
    doc="PDF out-link extraction (r11 third wave — PDFs cite URLs/DOIs "
    "via Link annotations, §12.5.6.5, and a crawl frontier wants those "
    "edges exactly like HTML anchors): per doc the encoder twin builds "
    "the fixture PDF (BOTH file layouts by id%3 — classic xref table "
    "and PDF 1.5 ObjStm+xref-stream, where the annotation dicts pack "
    "INTO the object stream) carrying two /Annots Link->URI actions — "
    "one clean absolute URL, one adversarial (uppercase scheme/host, "
    "explicit :443, a utm_ param) — then the REAL chain walks pages -> "
    "/Annots -> /Subtype /Link -> /A /S /URI and canonicalizes with "
    "the SAME kernel the HTML link graph uses (one frontier).  Oracle "
    "recomputes both edges per doc in closed form; the canonicalized "
    "second URL proves scheme/host folding, default-port and tracking "
    "strip THROUGH the PDF string decode.  Plan: two Arrow kernels + "
    "explode, shuffle-free; stateless (stream-safe); operators/pdf.py "
    "extract_pdf_links/pdf_link_edges",
)
def web_pdf_links(spark, sf):
    from esgopeta_spark.operators.pdf import pdf_link_edges, synth_pdf

    def links_of(did):
        return (
            f"https://ref{did % 9}.example.org/p/{did % 31}",
            f"HTTPS://CITE{did % 5}.EXAMPLE.ORG:443/d/{did}"
            f"?utm_source=pdf&x={did % 3}",
        )

    d = T(spark, sf, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    return pdf_link_edges(synth_pdf(d, links_of=links_of).drop("text"))


@register(
    "pipeline_policy_frontier",
    "G4,G1,A1",
    r"""
    WITH h AS (
      SELECT doc_id, doc_id % 40 AS hh, doc_id % 4 AS m FROM documents
    ), e AS (
      SELECT 'site' || hh || '.example.com' AS host,
             'https://site' || hh || '.example.com/f' || (doc_id % 11)
               AS url_canon,
             doc_id
      FROM h WHERE m IN (0, 1)
      UNION ALL
      SELECT 'ref' || (doc_id % 9) || '.example.org',
             'https://ref' || (doc_id % 9) || '.example.org/p/'
               || (doc_id % 31),
             doc_id
      FROM h WHERE doc_id % 2 = 0
    ), g AS (
      SELECT host, url_canon,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_sources
      FROM e GROUP BY host, url_canon
    )
    SELECT host, url_canon, n_sources,
           CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY url_canon)
                 - 1) // 4 AS BIGINT) AS fetch_wave
    FROM g
    """,
    doc="policy-gated discovery capstone (r11 third wave, ONE lineage): "
    "HTML pages run the POLICY link extractor — meta robots class "
    "cycling none/noindex/nofollow/none-token by id%4, one plain and "
    "one rel-nofollow anchor — and only follow=1 edges (plain anchors "
    "on pages whose meta allows following, id%4 in (0,1)) survive; "
    "even-id docs ALSO carry a fixture PDF whose Link annotation "
    "contributes its out-edge through the SAME canonicalizer (odd-id "
    "PDFs are absent — the no-annotation path at scale); the union "
    "dedups per (host, target) counting distinct contributing docs, "
    "then per-host politeness waves of 4 by url order — the frontier "
    "a polite crawler actually queues.  Oracle recomputes every "
    "surviving edge, source count, and wave in closed form from the "
    "id arithmetic.  Plan: two Arrow kernels + explode feeding ONE "
    "dedup aggregate + ONE host-keyed window — the two shuffles any "
    "100 TB frontier build needs, both on its natural keys; "
    "operators/web.py policy_link_edges + operators/pdf.py "
    "pdf_link_edges",
)
def pipeline_policy_frontier(spark, sf):
    from pyspark.sql import Window

    from esgopeta_spark.operators.pdf import pdf_link_edges, synth_pdf
    from esgopeta_spark.operators.web import policy_link_edges

    did = F.col("doc_id")
    m = did % 4
    meta = (
        F.when(m == 1, F.lit('<meta name="robots" content="noindex">'))
        .when(m == 2, F.lit('<meta name="robots" content="nofollow">'))
        .when(m == 3, F.lit('<meta name="robots" content="none">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit("<html><head>"), meta,
        F.lit('</head><body><a href="/f'), (did % 11).cast("string"),
        F.lit('">a</a><a rel="nofollow" href="/n'), (did % 13).cast("string"),
        F.lit('">b</a></body></html>'),
    )
    docs = T(spark, sf, "documents")
    pages = docs.select(
        "doc_id", _seed_url(did).alias("base_url"), html.alias("html")
    )
    html_edges = (
        policy_link_edges(pages)
        .where(F.col("follow") == 1)
        .select("doc_id", "url_canon")
    )

    def links_of(i):
        return (f"https://ref{i % 9}.example.org/p/{i % 31}",)

    pdfs = docs.where(did % 2 == 0).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    pdf_edges = pdf_link_edges(
        synth_pdf(pdfs, links_of=links_of).drop("text")
    ).select("doc_id", "url_canon")

    edges = html_edges.unionByName(pdf_edges).select(
        "doc_id", "url_canon",
        F.regexp_extract("url_canon", r"^https://([^/]+)", 1).alias("host"),
    )
    g = edges.groupBy("host", "url_canon").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_sources")
    )
    w = Window.partitionBy("host").orderBy(F.col("url_canon").asc())
    return g.select(
        "host", "url_canon", "n_sources",
        ((F.row_number().over(w) - 1) / 4).cast("bigint").alias("fetch_wave"),
    )


@register(
    "web_conditional_fetch",
    "G4,E3",
    r"""
    WITH b AS (
      SELECT doc_id,
             'https://site' || (doc_id % 40) || '.example.com/articles/'
               || doc_id || '?page=' || (doc_id % 7) AS uri,
             md5('cached:' || doc_id || ':' || coalesce(text, '')) AS old_md5,
             md5('fresh:' || doc_id || ':' || coalesce(text, '')) AS new_md5
      FROM documents
    )
    SELECT doc_id, uri, CAST(304 AS INTEGER) AS status,
           CASE WHEN doc_id % 15 = 3 THEN 'miss' ELSE 'cache' END
             AS fetch_source,
           CASE WHEN doc_id % 15 = 3 THEN '' ELSE old_md5 END AS page_md5
    FROM b WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, uri, CAST(200 AS INTEGER), 'network', new_md5
    FROM b WHERE doc_id % 3 <> 0
    """,
    doc="conditional-GET receive side (r11 — closes the revalidation "
    "loop web_revalidation_plan opens, RFC 9110 §15.4.5): ids%3==0 "
    "answer 304 Not Modified (no body — the saved bandwidth) and "
    "resolve to the STORED copy via one url-equi left join against the "
    "fetch store; the rest ship fresh 200 bodies (source 'network'); "
    "ids%15==3 are 304s whose store row was lost — a VISIBLE 'miss' "
    "verdict (refetch unconditionally), never a silent drop.  All row "
    "classes flow through ONE join (no split/re-union — the parse "
    "kernel is consumed once).  Oracle recomputes every verdict and "
    "both md5 families in closed form.  Plan: one Arrow kernel + one "
    "equi join on the store's natural url key; operators/web.py "
    "conditional_fetch_merge",
)
def web_conditional_fetch(spark, sf):
    from esgopeta_spark.operators.web import (
        conditional_fetch_merge,
        synth_conditional_warc,
    )

    did = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    docs = T(spark, sf, "documents")
    fixed = synth_conditional_warc(
        docs.select(
            "doc_id", _seed_url(did).alias("uri"),
            F.concat(F.lit("fresh:"), did.cast("string"), F.lit(":"), t)
            .alias("page"),
        )
    ).drop("page")
    store = docs.where(did % 15 != 3).select(
        _seed_url(did).alias("url"),
        F.md5(F.concat(F.lit("cached:"), did.cast("string"), F.lit(":"), t))
        .alias("page_md5"),
    )
    return conditional_fetch_merge(fixed, store)


@register(
    "web_idn_canonical",
    "G1,G4",
    r"""
    WITH h AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'xn--mnchen-3ya.example'
               WHEN 1 THEN 'xn--bcher-kva.example'
               WHEN 2 THEN 'ascii.example'
               ELSE 'docs.xn--r8jz45g.example' END AS host
      FROM documents
    )
    SELECT doc_id,
           'https://' || host || '/p/' || doc_id AS url_canon,
           host,
           CAST(CASE WHEN doc_id % 4 = 2 THEN 0 ELSE 1 END AS INTEGER)
             AS was_idn
    FROM h
    """,
    doc="IDN host canonicalization (r11 fifth wave, RFC 3490 — a real "
    "frontier sees the SAME site as both 'münchen.example' and its "
    "xn-- wire form, and URL-level dedup must fold them to one key): "
    "fixture urls cycle Unicode hosts MÜNCHEN.example / "
    "bücher.example / an ASCII control / a mixed-label docs.例え"
    ".example (the non-ASCII label folds, the ASCII label passes), "
    "with uppercase + trailing-dot + :443 adversaria riding along; "
    "the canonicalizer lowercases, strips, then punycodes each "
    "non-ASCII label via the stdlib idna codec (unencodable labels "
    "keep the host — total).  Oracle maps each row class to its "
    "KNOWN ACE literal — the punycode algorithm itself is pinned by "
    "the fixed expected strings, no IDN machinery oracle-side.  Plan: "
    "one Arrow kernel, shuffle-free; stateless (stream-safe); "
    "operators/web.py canonicalize_url",
)
def web_idn_canonical(spark, sf):
    from esgopeta_spark.operators.web import url_canonicalize

    did = F.col("doc_id")
    host = (
        F.when(did % 4 == 0, F.lit("MÜNCHEN.example."))
        .when(did % 4 == 1, F.lit("bücher.example"))
        .when(did % 4 == 2, F.lit("ASCII.example"))
        .otherwise(F.lit("docs.例え.example"))
    )
    url = F.concat(
        F.lit("HTTPS://"), host, F.lit(":443/p/"), did.cast("string")
    )
    d = T(spark, sf, "documents").select("doc_id", url.alias("url"))
    out = url_canonicalize(d).drop("url")
    return out.select(
        "doc_id", "url_canon",
        F.regexp_extract("url_canon", r"^https://([^/]+)", 1).alias("host"),
        F.when(did % 4 == 2, F.lit(0)).otherwise(F.lit(1))
        .cast("int").alias("was_idn"),
    )


@register(
    "web_meta_refresh",
    "G4,A1",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 40 AS h, doc_id % 3 AS m FROM documents
      WHERE doc_id % 3 <> 2
    )
    SELECT doc_id,
           CAST(CASE WHEN m = 0 THEN 0
                     ELSE (doc_id % 30) * 1000 + 500 END AS BIGINT)
             AS delay_milli,
           CASE WHEN m = 0 THEN '/moved/' || (doc_id % 13)
                ELSE 'HTTPS://SITE' || h || '.EXAMPLE.COM:443/next/'
                     || doc_id || '?utm_source=r&x=1' END AS href,
           CASE WHEN m = 0
                THEN 'https://site' || h || '.example.com/moved/'
                     || (doc_id % 13)
                ELSE 'https://site' || h || '.example.com/next/'
                     || doc_id || '?x=1' END AS url_canon
    FROM b
    """,
    doc="meta-refresh client-side redirects (r11 fifth wave, the WHATWG "
    "declarative refresh — the redirect class HTTP-status collapse "
    "never sees; moved pages and interstitials use it constantly): "
    "id%3==0 pages declare content='0;url=/moved/k' (instant, "
    "root-relative, quoted url), id%3==1 pages "
    "'<k>.5 , URL = \"ABSOLUTE...\"' (fractional delay parsed "
    "digit-wise to milli — never through a float — comma separator, "
    "spaced URL= key, quoted absolute target with uppercase host/"
    ":443/utm param that the shared canonicalizer must fold), id%3==2 "
    "pages declare nothing and emit nothing; a decoy non-refresh meta "
    "rides every page.  Edges resolve against the page URL with the "
    "same RFC 3986 kernel as 3xx Location edges, so they union "
    "straight into collapse_redirects.  Oracle recomputes every "
    "(delay, href, canonical target) in closed form.  Plan: one Arrow "
    "kernel + explode, shuffle-free; stateless (stream-safe); "
    "operators/web.py extract_meta_refresh/meta_refresh_edges",
)
def web_meta_refresh(spark, sf):
    from esgopeta_spark.operators.web import meta_refresh_edges

    did = F.col("doc_id")
    m = did % 3
    meta = (
        F.when(
            m == 0,
            F.concat(
                F.lit('<meta http-equiv="refresh" content=\'0;url="/moved/'),
                (did % 13).cast("string"), F.lit("\"'>"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit('<META HTTP-EQUIV=Refresh CONTENT="'),
                (did % 30).cast("string"),
                F.lit('.5 , URL = HTTPS://SITE'),
                (did % 40).cast("string"),
                F.lit(".EXAMPLE.COM:443/next/"), did.cast("string"),
                F.lit('?utm_source=r&amp;x=1">'),
            ),
        )
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit('<html><head><meta name="viewport" content="width=1">'),
        meta,
        F.lit("</head><body>x</body></html>"),
    )
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("base_url"), html.alias("html")
    )
    return meta_refresh_edges(d)


@register(
    "web_host_components",
    "G4,G2,A1",
    r"""
    WITH g AS (SELECT DISTINCT doc_id % 40 AS h FROM documents)
    SELECT CAST(h AS BIGINT) AS host_id,
           CAST(CASE WHEN h = 37 THEN 37 ELSE (h // 4) * 4 END AS BIGINT)
             AS comp,
           CAST(CASE WHEN h = 37 THEN 1
                     WHEN (h // 4) * 4 = 36 THEN 3
                     ELSE 4 END AS BIGINT) AS comp_size
    FROM g
    """,
    doc="host-graph connected components (r11 fifth wave — the "
    "whole-DOMAIN view link spam and mirror detection key on: a mirror "
    "farm is one component however many hostnames it spreads over): "
    "per doc a fixture page links its host h=id%40 to its group-of-4 "
    "leader (h - h%4), EXCEPT host 37 whose docs declare nothing — "
    "the isolated-host class that must come back as its own singleton "
    "via the left-join-coalesce rule, never silently vanish.  Edges "
    "come off the REAL quote-aware link scanner + RFC 3986 resolve + "
    "canonicalizer (host ids parsed back from the canonical urls), "
    "components from the shared min-label pointer-jumping operator "
    "(one localCheckpoint per round, O(log diameter) rounds — the "
    "SemDeDup machinery re-used on the web graph).  Oracle states the "
    "designed component structure in closed form.  Plan: one kernel + "
    "explode -> distinct host edges (tiny) -> iterative equi joins, "
    "no cartesian; operators/web.py link_edges + operators/dedup.py "
    "dup_components",
)
def web_host_components(spark, sf):
    from esgopeta_spark.operators.dedup import dup_components
    from esgopeta_spark.operators.web import link_edges
    from pyspark.sql import Window

    did = F.col("doc_id")
    h = did % 40
    leader = h - (h % 4)
    html = F.when(
        h != 37,
        F.concat(
            F.lit('<p><a href="https://site'), leader.cast("string"),
            F.lit('.example.com/">leader</a></p>'),
        ),
    ).otherwise(F.lit("<p>no links</p>"))
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("base_url"), html.alias("html")
    )
    edges = (
        link_edges(d)
        .select(
            F.regexp_extract(
                _seed_url(F.col("doc_id")), r"^https://site(\d+)\.", 1
            ).cast("bigint").alias("id_a"),
            F.regexp_extract("url_canon", r"^https://site(\d+)\.", 1)
            .cast("bigint").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    comps = dup_components(edges)
    hosts = (
        T(spark, sf, "documents")
        .select((F.col("doc_id") % 40).cast("bigint").alias("host_id"))
        .distinct()
    )
    out = hosts.join(
        comps.withColumnRenamed("id", "host_id"), "host_id", "left"
    ).select(
        "host_id",
        F.coalesce("comp", F.col("host_id")).cast("bigint").alias("comp"),
    )
    return out.select(
        "host_id", "comp",
        F.count("*").over(Window.partitionBy("comp")).cast("bigint")
        .alias("comp_size"),
    )


def _warc_pairs_oracle():
    from esgopeta_spark.operators.web import synth_html_sql

    return rf"""
    WITH p AS (
      SELECT doc_id, {synth_html_sql()} AS page,
             '/articles/' || doc_id || '?page=' || (doc_id % 7) AS path,
             {_SEED_SQL} AS uri
      FROM documents
    )
    SELECT doc_id, uri,
           CASE WHEN doc_id % 7 = 3 THEN '' ELSE 'GET' END AS method,
           CASE WHEN doc_id % 7 = 3 THEN '' ELSE path END AS path,
           CAST(200 AS INTEGER) AS status,
           CAST(octet_length(encode(page)) AS BIGINT) AS n_body,
           CAST(CASE WHEN doc_id % 7 = 3 THEN 0 ELSE 1 END AS INTEGER)
             AS paired
    FROM p
    """


@register(
    "web_warc_pairing",
    "G4,E1",
    _warc_pairs_oracle(),
    doc="WARC request/response pairing (r11 — real crawlers write the "
    "request record beside its response, linked by WARC-Concurrent-To, "
    "ISO 28500 §5.7; politeness audits, POST filtering, and soft-404 "
    "analysis need the request side back): per doc the encoder twin "
    "writes the adjacent pair (GET message with the real path; 200 "
    "response framing the fixture page), EXCEPT id%7==3 whose request "
    "is omitted — the dangling class that must surface as a VISIBLE "
    "unpaired row (method/path '', paired=0), never a silent drop.  "
    "Pairing is kernel-local (the pair is adjacent in the file — no "
    "shuffle at any corpus size).  Oracle recomputes method/path/"
    "status/body-octets per row class in closed form; n_body's "
    "octet_length(page) proves the response body framed and recovered "
    "byte-exactly through the pairing path.  Plan: two Arrow kernels "
    "over one scan, shuffle-free; stateless (stream-safe); "
    "operators/web.py synth_paired_warc/warc_request_pairs",
)
def web_warc_pairing(spark, sf):
    from esgopeta_spark.operators.web import (
        synth_html,
        synth_paired_warc,
        warc_request_pairs,
    )

    did = F.col("doc_id")
    d = T(spark, sf, "documents").select(
        "doc_id",
        _seed_url(did).alias("uri"),
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("page"),
    )
    return warc_request_pairs(synth_paired_warc(d).drop("page"))


@register(
    "web_soft404_flags",
    "G4",
    r"""
    WITH b AS (
      SELECT doc_id, doc_id % 4 AS m,
             trim(regexp_replace(coalesce(text, ''), '[ \t\n\r\f\v]+', ' ',
                  'g')) AS body
      FROM documents
    ), r AS (
      SELECT doc_id, m,
             CASE WHEN m = 1 THEN 'Error 404 Not Found - the page you '
                       || 'requested does not exist on this server'
                  WHEN m = 2 THEN 'Sorry! Page Not Found. ' || body
                  ELSE body END AS t,
             CASE WHEN m = 3 THEN 404 ELSE 200 END AS status
      FROM b
    )
    SELECT doc_id, CAST(status AS INTEGER) AS status,
           CAST(CASE WHEN m IN (1, 2) THEN 1 ELSE 0 END AS INTEGER)
             AS phrase_hit,
           CAST(CASE WHEN length(lower(t)) < 120 THEN 1 ELSE 0 END
                AS INTEGER) AS short_body,
           CAST(CASE WHEN m IN (1, 2) THEN 1 ELSE 0 END AS INTEGER)
             AS soft404,
           CAST(CASE WHEN m = 3 THEN 1 ELSE 0 END AS INTEGER) AS hard_error
    FROM r
    """,
    doc="soft-404 detection (r11 — the crawl-QA cut: servers answering "
    "200 with an error PAGE poison dedup with a corpus-wide shared "
    "template and waste training tokens): fixture classes cycle a real "
    "page / an uppercase '404 Not Found ... does not exist' template "
    "(case-folded phrase probe) / an error phrase PREFIXED onto real "
    "content (long bodies still flag — shortness is a side signal, "
    "not the verdict) / a real 404 (hard_error, not soft404).  All "
    "codegen substring probes; oracle recomputes every flag per row "
    "class.  Plan: one projection, no kernel, no shuffle; stateless "
    "(stream-safe); operators/web.py soft404_flags",
)
def web_soft404_flags(spark, sf):
    from esgopeta_spark.operators.web import soft404_flags

    did = F.col("doc_id")
    m = did % 4
    body = F.trim(
        F.regexp_replace(F.coalesce(F.col("text"), F.lit("")),
                         r"[ \t\n\r\f\v]+", " ")
    )
    t = (
        F.when(m == 1, F.lit("Error 404 Not Found - the page you "
                             "requested does not exist on this server"))
        .when(m == 2, F.concat(F.lit("Sorry! Page Not Found. "), body))
        .otherwise(body)
    )
    status = F.when(m == 3, F.lit(404)).otherwise(F.lit(200))
    d = T(spark, sf, "documents").select(
        "doc_id", status.alias("status"), t.alias("clean_text")
    )
    return soft404_flags(d)


# -- r12: mojibake (double-encoding) repair ----------------------------------
# the shared fixture constants: every engine-side literal derives from
# _MOJI_TRUE, so the oracle recomputes the expected repair in closed form
_MOJI_TRUE = " café naïve fiancée ©«»"
_MOJI_1 = _MOJI_TRUE.encode("utf-8").decode("cp1252")       # single mojibake
_MOJI_2 = _MOJI_1.encode("utf-8").decode("cp1252")          # double mojibake


@register(
    "text_fix_mojibake",
    "G4",
    f"""
    WITH c AS (SELECT doc_id, coalesce(text, '') AS t FROM documents)
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN t
                ELSE t || '{_MOJI_TRUE}' END AS fixed_text,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS INTEGER)
             AS changed
    FROM c
    """,
    doc="mojibake repair (r12 — the encoding-fix pass of the C4/ftfy "
    "lineage, between charset decode and every downstream stage: a "
    "double-encoded duplicate hashes differently from its clean twin "
    "until this runs): re-encode through the same cp1252/latin-1 map "
    "and accept only bytes that form valid UTF-8 that differs, "
    "iterated to the strictly-shrinking fixpoint; pure-ASCII, genuine "
    "Latin-1 prose, and non-Latin text all pass through unchanged "
    "(conservative, total, idempotent — fuzz-pinned).  Fixture: "
    "id%3==1 docs carry a single-encoded suffix, id%3==2 a "
    "DOUBLE-encoded one (two repair rounds), id%3==0 stay clean "
    "(changed=0 pins the no-false-positive side); every literal "
    "derives from one shared constant so the oracle recomputes the "
    "expected repair in closed form.  Plan: one Arrow kernel over one "
    "scan, shuffle-free; stateless (streams as-is); "
    "operators/text.py repair_mojibake/fix_mojibake",
)
def text_fix_mojibake(spark, sf):
    from esgopeta_spark.operators.text import fix_mojibake

    did = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    inp = (
        F.when(did % 3 == 1, F.concat(t, F.lit(_MOJI_1)))
        .when(did % 3 == 2, F.concat(t, F.lit(_MOJI_2)))
        .otherwise(t)
    )
    d = T(spark, sf, "documents").select("doc_id", inp.alias("text"))
    return fix_mojibake(d)


@register(
    "web_xrobots_gate",
    "G4,E1",
    """
    WITH c AS (
      SELECT doc_id, doc_id % 5 AS hc, (doc_id // 5) % 3 AS mc,
             CASE WHEN doc_id % 23 = 1 THEN 1 ELSE 0 END AS poison
      FROM documents)
    SELECT doc_id,
      CASE WHEN poison = 1 THEN 'error'
           ELSE 'https://site' || (doc_id % 40) || '.example.com/articles/'
                || doc_id || '?page=' || (doc_id % 7) END AS uri,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN hc IN (1, 4) THEN 1 ELSE 0 END
           AS INTEGER) AS hdr_noindex,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN hc = 2 THEN 1 ELSE 0 END
           AS INTEGER) AS hdr_nofollow,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN mc IN (1, 2) THEN 1 ELSE 0 END
           AS INTEGER) AS meta_noindex,
      CAST(CASE WHEN poison = 1 THEN -1 WHEN mc = 2 THEN 1 ELSE 0 END
           AS INTEGER) AS meta_nofollow,
      CAST(CASE WHEN poison = 1 THEN -1
                WHEN hc IN (1, 4) OR mc IN (1, 2) THEN 1 ELSE 0 END
           AS INTEGER) AS noindex,
      CAST(CASE WHEN poison = 1 THEN -1
                WHEN hc = 2 OR mc = 2 THEN 1 ELSE 0 END
           AS INTEGER) AS nofollow
    FROM c
    """,
    doc="page-level robots verdict, header + meta combined (r12 — "
    "completes the indexability chain: robots.txt gates the FETCH, "
    "meta robots gates html, X-Robots-Tag gates everything else — "
    "PDFs above all, which no meta tag can ride): unwrap the HTTP "
    "message from the WARC record, parse the X-Robots-Tag header "
    "(comma tokens, 'none' = both, AGENT-SCOPED values ignored — the "
    "googlebot-scoped class must read 0 — but value-taking directives "
    "like 'max-snippet: -1' must NOT scope away a trailing noindex, "
    "the r12 ADVICE regression class), read <meta name=robots> "
    "from the charset-sniffed html body, union most-restrictive.  "
    "Fixture crosses 5 header classes x 3 meta classes; id%23==1 "
    "ships poison and must surface as the visible all--1 marker row.  "
    "Plan: one Arrow kernel over one scan, shuffle-free; "
    "operators/web.py parse_xrobots/warc_robots_directives",
)
def web_xrobots_gate(spark, sf):
    from esgopeta_spark.operators.web import (
        synth_xrobots_warc,
        warc_robots_directives,
    )

    did = F.col("doc_id")
    # r14 (optimization): A/B'd a scan widening and left the serial
    # shape — light kernels (see web_url_canonical_dedup; the paired
    # clean probe read serial 1.18 s vs widened 1.86 s).
    d = T(spark, sf, "documents").select(
        "doc_id", _seed_url(did).alias("uri")
    )
    return warc_robots_directives(synth_xrobots_warc(d).drop("uri"))


def _zstd_house_oracle():
    from esgopeta_spark.operators.web import synth_html_sql

    return rf"""
    WITH p AS (
      SELECT doc_id, {synth_html_sql()} AS page FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 23 = 1 THEN 0 ELSE 1 END AS INTEGER) AS ok,
           CASE WHEN doc_id % 23 = 1 THEN '' ELSE md5(page) END AS page_md5,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1 ELSE length(page) END
                AS BIGINT) AS n_chars
    FROM p
    """


@register(
    "web_zstd_house_decode",
    "G4,G5,E1",
    _zstd_house_oracle(),
    doc="the FROM-SCRATCH RFC 8878 zstd decoder, driver-visible (r13 — "
    "the runtime Content-Encoding unwrap prefers pyarrow's C path, so "
    "without this entry the house decoder would be pytest-only): per "
    "doc the fixture page is compressed by the REFERENCE encoder "
    "(libzstd via pyarrow) at level 1/3/9/19 by id%4 — spanning "
    "raw/RLE blocks through stream-described FSE tables, treeless "
    "blocks and 4-stream Huffman literals — and decoded by "
    "operators/zstd.py alone; md5+length are over the recovered page "
    "so one wrong byte in any FSE/Huffman/sequence path mismatches "
    "the closed-form oracle.  id%23==1 ships a truncated frame that "
    "must quarantine to the visible (0, '', -1) row (truncation fails "
    "deterministically against the declared content size; a byte flip "
    "would not).  Plan: two Arrow kernels over one widened scan, "
    "shuffle-free; stateless (streams as-is); operators/zstd.py + "
    "web.synth_zstd_blobs/zstd_house_digest",
)
def web_zstd_house_decode(spark, sf):
    from esgopeta_spark.operators.web import (
        synth_html,
        synth_zstd_blobs,
        zstd_house_digest,
    )
    from esgopeta_spark.session import ensure_min_partitions

    did = F.col("doc_id")
    d = ensure_min_partitions(T(spark, sf, "documents")).select(
        "doc_id",
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("page"),
    )
    return zstd_house_digest(synth_zstd_blobs(d).drop("page"))


@register(
    "web_zstd_house_encode",
    "G4,G5,E1",
    _zstd_house_oracle().replace(
        "AS n_chars",
        "AS n_chars,\n           CAST(CASE WHEN doc_id % 23 = 1 THEN 0 "
        "ELSE 1 END AS INTEGER) AS house_agree",
    ),
    doc="the FROM-SCRATCH RFC 8878 zstd ENCODER (r14, r13 verdict #2 — "
    "the write side of the loop: a real pipeline writes .warc.zst "
    "too): per doc the fixture page is compressed by operators/"
    "zstd.py zstd_compress at level 1/3/9/19 by id%4 — raw/RLE "
    "blocks, Huffman 1- and 4-stream literals, RLE/predefined/"
    "stream-described FSE sequence tables — and decoded by the "
    "REFERENCE decoder (libzstd via pyarrow), the authority on "
    "conformance; md5+length are over the libzstd-recovered page so "
    "one wrong bit in any table description or backstream mismatches "
    "the closed-form oracle.  house_agree pins the house decoder to "
    "the same bytes (self-consistency rides along, never substitutes)."
    "  id%23==1 truncates the house frame and must quarantine to the "
    "visible (0, '', -1, 0) row.  Plan: one Arrow kernel over one "
    "widened scan, shuffle-free; stateless (streams as-is); "
    "operators/zstd.py:1191 + web.zstd_house_roundtrip",
)
def web_zstd_house_encode(spark, sf):
    from esgopeta_spark.operators.web import (
        synth_html,
        zstd_house_roundtrip,
    )
    from esgopeta_spark.session import ensure_min_partitions

    did = F.col("doc_id")
    d = ensure_min_partitions(T(spark, sf, "documents")).select(
        "doc_id",
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("page"),
    )
    return zstd_house_roundtrip(d)


def _srt_oracle() -> str:
    from esgopeta_spark.operators.subtitles import synth_srt_sql  # noqa: F401

    clean = "regexp_replace(coalesce(text, ''), '[\\n\\r]', ' ', 'g')"
    return rf"""
    SELECT d.doc_id,
           CAST(k.k AS BIGINT) AS cue_idx,
           CAST(CASE WHEN d.doc_id % 23 = 1 AND k.k = 1 THEN 0 ELSE 1 END
                AS INTEGER) AS ok,
           CAST(CASE WHEN d.doc_id % 23 = 1 AND k.k = 1 THEN -1
                ELSE k.k * 2000 + (d.doc_id % 7) * 111 END AS BIGINT)
                AS start_ms,
           CAST(CASE WHEN d.doc_id % 23 = 1 AND k.k = 1 THEN -1
                ELSE k.k * 2000 + (d.doc_id % 7) * 111
                     + 1500 + (d.doc_id % 3) * 200 END AS BIGINT) AS end_ms,
           CAST(CASE WHEN d.doc_id % 23 = 1 AND k.k = 1 THEN -1
                ELSE 1500 + (d.doc_id % 3) * 200 END AS BIGINT) AS dur_ms,
           CAST(CASE WHEN d.doc_id % 23 = 1 AND k.k = 1 THEN -1
                ELSE length('cue ' || (k.k + 1) || ': '
                            || substr({clean}, 1 + k.k * 17, 23)) END
                AS BIGINT) AS n_chars,
           CASE WHEN d.doc_id % 23 = 1 AND k.k = 1 THEN ''
                ELSE md5('cue ' || (k.k + 1) || ': '
                         || substr({clean}, 1 + k.k * 17, 23)) END
                AS text_md5
    FROM documents d, generate_series(0, 5) AS k(k)
    WHERE k.k < 3 + d.doc_id % 4
    """


@register(
    "text_srt_cues",
    "G4,G5,E2",
    _srt_oracle(),
    doc="SRT subtitle parsing, all-codegen (r14 — the video<->text "
    "modality: caption files are the textual supervision video-LM "
    "corpora train on): per doc the fixture SRT (cue count/timing/"
    "phase by residue class, text = corpus slices, newline-sanitized; "
    "synth twin byte-identical across engines) parses through builtin "
    "split/posexplode/regexp expressions alone — block structure, "
    "index-line verification against the block position, the "
    "HH:MM:SS,mmm timing regex, ms arithmetic, and the per-cue text "
    "md5, so one wrong capture group or off-by-one slice mismatches "
    "the closed-form oracle on every cue.  id%23==1 plants a "
    "malformed arrow on cue 1 that must degrade to the visible "
    "(0, -1, '') row.  Plan: one scan -> posexplode -> codegen "
    "projections, no shuffle, no kernels; stateless (streams as-is); "
    "operators/subtitles.py",
)
def text_srt_cues(spark, sf):
    from esgopeta_spark.operators.subtitles import parse_srt_cues, synth_srt

    d = T(spark, sf, "documents").select(
        "doc_id",
        synth_srt(F.col("doc_id"), F.col("text")).alias("srt"),
    )
    return parse_srt_cues(d)


def _srt_align_oracle() -> str:
    return """
    SELECT d.doc_id,
           CAST(t.t AS BIGINT) AS t_ms,
           CAST(CASE
             WHEN t.t >= (d.doc_id % 7) * 111
                  AND ((t.t - (d.doc_id % 7) * 111) % 2000)
                      < 1500 + (d.doc_id % 3) * 200
                  AND (t.t - (d.doc_id % 7) * 111) // 2000
                      < 3 + d.doc_id % 4
                  AND NOT (d.doc_id % 23 = 1
                           AND (t.t - (d.doc_id % 7) * 111) // 2000 = 1)
             THEN (t.t - (d.doc_id % 7) * 111) // 2000
             ELSE -1 END AS BIGINT) AS cue_idx
    FROM documents d, generate_series(0, 13000, 1000) AS t(t)
    """


@register(
    "pipeline_srt_frame_align",
    "G4,G5,E3",
    _srt_align_oracle(),
    doc="subtitle->frame alignment (r14 — the video-text pair "
    "builder's join): the parsed cue intervals land on the uniform "
    "1 s frame-sampling grid; each frame takes the covering cue or "
    "the visible -1 (gaps between cues, the pre-phase lead-in, past "
    "the last cue — and every frame the poison doc's MALFORMED cue 1 "
    "failed to claim, so upstream degradation propagates through the "
    "alignment instead of vanishing).  The oracle derives coverage in "
    "closed form from the fixture's timing arithmetic — the Spark "
    "side must reproduce it through the real parse + interval join.  "
    "Plan: codegen parse -> per-doc sequence explode -> ONE left "
    "equi+range join (doc key hash-partitions both sides, the "
    "interval predicate filters in-partition; never cartesian, at "
    "most 1:1 by the non-overlap contract); operators/subtitles.py",
)
def pipeline_srt_frame_align(spark, sf):
    from esgopeta_spark.operators.subtitles import (
        align_cues_to_frames,
        parse_srt_cues,
        synth_srt,
    )

    d = T(spark, sf, "documents").select(
        "doc_id",
        synth_srt(F.col("doc_id"), F.col("text")).alias("srt"),
    )
    return align_cues_to_frames(parse_srt_cues(d))


@register(
    "text_vtt_cues",
    "G4,G5,E2",
    # the VTT fixture's parsed fields are the SAME closed forms as the
    # SRT oracle (shared cue arithmetic by design): reuse it verbatim
    _srt_oracle(),
    doc="WebVTT subtitle parsing, all-codegen (r14 — the web's caption "
    "dialect beside SRT; shared cue arithmetic so the two parsers are "
    "directly comparable and the SRT oracle applies verbatim): the "
    "fixture exercises the WEBVTT header block (cue_idx counts cues, "
    "not blocks), OPTIONAL identifier lines (the timing line is "
    "found by its arrow, not its position), the hourless MM:SS.mmm "
    "timestamp form on cue 0, dot milliseconds, and cue settings "
    "after the end timestamp ('align:start' must not break parsing). "
    " id%23==1 malforms cue 1's arrow -> the visible (0, -1, '') "
    "row.  Plan: one scan -> posexplode -> codegen projections, no "
    "shuffle, no kernels; stateless (streams as-is); "
    "operators/subtitles.py parse_vtt_cues/synth_vtt",
)
def text_vtt_cues(spark, sf):
    from esgopeta_spark.operators.subtitles import parse_vtt_cues, synth_vtt

    d = T(spark, sf, "documents").select(
        "doc_id",
        synth_vtt(F.col("doc_id"), F.col("text")).alias("vtt"),
    )
    return parse_vtt_cues(d)


@register(
    "web_warc_zst_write",
    "G4,G5,E1",
    _zstd_house_oracle().replace(
        "CASE WHEN doc_id % 23 = 1 THEN '' ELSE md5(page) END AS page_md5",
        "CAST(CASE WHEN doc_id % 23 = 1 THEN -1 ELSE 2 END AS INTEGER) "
        "AS n_records,\n           "
        "CASE WHEN doc_id % 23 = 1 THEN '' ELSE md5(page) END AS page_md5",
    ),
    doc="the .warc.zst WRITE path (r14 — closes the archive loop the "
    "r13 decode opened: a real pipeline WRITES its crawl archives "
    "too): per doc a two-record WARC is compressed frame-per-record "
    "by the HOUSE RFC 8878 encoder (the standard seekable layout; "
    "id%5==0 prepends a skippable dictionary-slot frame) and read "
    "back through the PRODUCTION ingest chain — maybe_gunzip_warc's "
    "pyarrow/libzstd streaming decode, the reference implementation "
    "as authority — then parse_warc's declared-length framing; md5 + "
    "length are over the recovered response payload so one wrong "
    "byte anywhere in frame assembly or record framing mismatches "
    "the closed-form oracle.  id%23==1 truncates the final frame -> "
    "the visible (0, -1, '', -1) row.  Plan: one Arrow kernel over "
    "one widened scan, shuffle-free; stateless (streams as-is); "
    "operators/zstd.py + web.warc_zst_house_write",
)
def web_warc_zst_write(spark, sf):
    from esgopeta_spark.operators.web import (
        synth_html,
        warc_zst_house_write,
    )
    from esgopeta_spark.session import ensure_min_partitions

    did = F.col("doc_id")
    d = ensure_min_partitions(T(spark, sf, "documents")).select(
        "doc_id",
        synth_html(did, F.coalesce(F.col("text"), F.lit(""))).alias("page"),
    )
    return warc_zst_house_write(d)


def _docx_oracle() -> str:
    from esgopeta_spark.operators.docx import synth_docx_expected_sql

    exp = synth_docx_expected_sql()
    return rf"""
    WITH p AS (SELECT doc_id, {exp} AS txt FROM documents)
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 23 = 1 THEN 0 ELSE 1 END AS INTEGER) AS ok,
           CASE WHEN doc_id % 23 = 1 THEN '' ELSE md5(txt) END AS text_md5,
           CAST(CASE WHEN doc_id % 23 = 1 THEN -1 ELSE length(txt) END
                AS BIGINT) AS n_chars
    FROM p
    """


@register(
    "text_docx_extract",
    "G4,E1",
    _docx_oracle(),
    doc="DOCX text extraction (r14 — the office-document ingest format "
    "beside HTML and PDF; OPC zip + WordprocessingML): per doc the "
    "fixture package (three paragraphs of corpus slices with a "
    "split-across-runs middle, an explicit tab, a line break, entity "
    "escaping, and a 1x2 TABLE whose cells read as text — the C4 "
    "lineage choice) extracts through the real zip walk + w:t/w:tab/"
    "w:br/paragraph token scan (operators/docx.py), so one wrong join "
    "rule, missed whitespace control, or unescape slip mismatches the "
    "closed-form md5.  id%23==1 ships a corrupted central directory "
    "that must quarantine to the visible (0, '', -1) row.  Plan: one "
    "Arrow kernel over one widened scan, shuffle-free; stateless "
    "(streams as-is)",
)
def text_docx_extract(spark, sf):
    from esgopeta_spark.session import ensure_min_partitions

    d = ensure_min_partitions(
        T(spark, sf, "documents").select("doc_id", "text"))

    @F.pandas_udf("struct<ok: int, text_md5: string, n_chars: bigint>")
    def _ex(did, text):
        import hashlib

        import pandas as _pd

        from esgopeta_spark.operators.docx import (
            extract_docx_text,
            synth_docx,
        )

        oks, md5s, ns = [], [], []
        for dd, t in zip(did, text):
            dd = int(dd)
            blob = synth_docx(dd, t if isinstance(t, str) else "")
            try:
                txt = extract_docx_text(blob)
                oks.append(1)
                md5s.append(hashlib.md5(txt.encode("utf-8")).hexdigest())
                ns.append(len(txt))
            except ValueError:
                oks.append(0)
                md5s.append("")
                ns.append(-1)
        return _pd.DataFrame({"ok": oks, "text_md5": md5s, "n_chars": ns})

    out = d.select(
        F.col("doc_id"), _ex(F.col("doc_id"), F.col("text")).alias("_d"))
    return out.select("doc_id", "_d.ok", "_d.text_md5", "_d.n_chars")
