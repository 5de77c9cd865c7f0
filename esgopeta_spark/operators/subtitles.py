"""SRT subtitle parsing + subtitle↔frame alignment (r14) — the
video↔text modality a video-LM training pipeline ingests beside the
frame stream: caption files carry the only textual supervision most
video corpora have, and the alignment of cue intervals onto the frame
sampling grid is the join every video-text pair builder runs.

Everything here is PURE CODEGEN (no kernels, no UDFs): the SRT block
structure splits/regexes apart with builtin functions, so the parser
runs JVM-side at scan throughput and streams as-is (stateless).  The
fixture twin (`synth_srt` / `synth_srt_sql`) builds a deterministic
SRT from the corpus text out of shared literal chunks, so the DuckDB
oracle recomputes every parsed field — and the md5 of every cue's
text — in closed form (the encoder-twin discipline: parse(synth(x))
must equal analytic(x) hash-exactly).

Malformed cues DEGRADE per row (ok=0, -1 fields), never raise — the
TOTAL-kernel doctrine; the graded fixture plants one malformed timing
line per poison doc and the oracle asserts exactly that cue surfaces,
and the alignment entry shows the poison PROPAGATING (the malformed
cue's interval goes uncovered on the frame grid).

Reference parity anchor: cretz/esgopeta has no media surface; this
implements the mandated multimodal scope (SURVEY.md §2 G4/G5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixture geometry: up to 6 cues, 2 s apart, sub-2 s durations (so
#: cues never overlap), a per-doc phase offset under 667 ms.
MAX_CUES = 6
CUE_SPACING_MS = 2000
FRAME_STEP_MS = 1000
#: alignment grid end — covers the latest possible cue end (12 566 ms)
ALIGN_GRID_MS = 13000


def _ts(ms_col):
    """'HH:MM:SS,mmm' from a non-negative integer-ms Column, codegen."""
    ms_col = ms_col.cast("bigint")
    p2 = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    return F.concat(
        p2(F.floor(ms_col / 3600000).cast("bigint")), F.lit(":"),
        p2(F.floor(ms_col / 60000).cast("bigint") % 60), F.lit(":"),
        p2(F.floor(ms_col / 1000).cast("bigint") % 60), F.lit(","),
        F.lpad((ms_col % 1000).cast("string"), 3, "0"),
    )


def synth_srt(doc_id_col, text_col):
    """Deterministic SRT per doc, pure codegen: n_cues = 3 + id%4;
    cue k starts at k*2000 + (id%7)*111 ms and lasts 1500 + (id%3)*200
    ms (never overlapping); cue text = 'cue <k+1>: ' + a 23-char
    corpus slice (newlines sanitized so the block structure survives).
    id%23==1 docs carry a MALFORMED arrow on cue index 1 — the poison
    the parser must degrade on, visibly.  Twin: :func:`synth_srt_sql`."""
    d = doc_id_col
    clean = F.regexp_replace(
        F.coalesce(text_col, F.lit("")), "[\\n\\r]", " ")
    off = (d % 7) * 111
    dur = F.lit(1500) + (d % 3) * 200
    n_cues = F.lit(3) + d % 4
    blocks = []
    for k in range(MAX_CUES):
        start = F.lit(k * CUE_SPACING_MS) + off
        arrow = F.when(
            (d % 23 == 1) & (F.lit(k) == 1), F.lit(" -> ")
        ).otherwise(F.lit(" --> "))
        block = F.concat(
            F.lit(("" if k == 0 else "\n\n") + f"{k + 1}\n"),
            _ts(start), arrow, _ts(start + dur), F.lit("\n"),
            F.lit(f"cue {k + 1}: "),
            F.substring(clean, 1 + k * 17, 23),
        )
        blocks.append(F.when(F.lit(k) < n_cues, block).otherwise(F.lit("")))
    return F.concat(*blocks)


def synth_srt_sql(text_expr: str = "coalesce(text, '')",
                  id_expr: str = "doc_id") -> str:
    """DuckDB expression rebuilding :func:`synth_srt` byte-identically
    (same literal chunks, same integer arithmetic)."""
    clean = f"regexp_replace({text_expr}, '[\\n\\r]', ' ', 'g')"

    def ts(ms: str) -> str:
        return (
            f"lpad(CAST(({ms}) // 3600000 AS VARCHAR), 2, '0') || ':' || "
            f"lpad(CAST((({ms}) // 60000) % 60 AS VARCHAR), 2, '0') || ':' || "
            f"lpad(CAST((({ms}) // 1000) % 60 AS VARCHAR), 2, '0') || ',' || "
            f"lpad(CAST(({ms}) % 1000 AS VARCHAR), 3, '0')"
        )

    parts = []
    for k in range(MAX_CUES):
        start = f"({k * CUE_SPACING_MS} + ({id_expr} % 7) * 111)"
        end = f"({start} + 1500 + ({id_expr} % 3) * 200)"
        arrow = (
            f"CASE WHEN {id_expr} % 23 = 1 AND {k} = 1 "
            f"THEN ' -> ' ELSE ' --> ' END"
        )
        head = ("''" if k == 0 else "e'\\n\\n'")
        block = (
            f"{head} || '{k + 1}' || e'\\n' || {ts(start)} || {arrow} || "
            f"{ts(end)} || e'\\n' || 'cue {k + 1}: ' || "
            f"substr({clean}, {1 + k * 17}, 23)"
        )
        parts.append(
            f"CASE WHEN {k} < 3 + {id_expr} % 4 THEN {block} ELSE '' END")
    return "(" + " || ".join(parts) + ")"


_TIME_RE = (
    r"^(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> "
    r"(\d{2}):(\d{2}):(\d{2}),(\d{3})\s*$"
)


def parse_srt_cues(
    df: DataFrame, srt_col: str = "srt", id_col: str = "doc_id"
) -> DataFrame:
    """SRT text -> one row per cue block: (doc_id, cue_idx, ok,
    start_ms, end_ms, dur_ms, n_chars, text_md5).  ALL CODEGEN — block
    split, index-line verification (the numeric line must equal the
    block position + 1), the timing regex, ms arithmetic, and the cue
    text digest run as builtin expressions; malformed blocks (bad
    index line, bad timing, missing text, negative duration) degrade
    to visible (ok=0, -1, '') rows, never raise.  Multi-line cue text
    joins with a single space.  Stateless: streams as-is.

    Scale shape: one scan -> posexplode -> projections; the only data
    movement is the explode (no shuffle, no kernel) — at 100 TB this
    runs at parquet-scan throughput inside one codegen stage."""
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(srt_col), "\n\n")).alias("cue_idx", "_b"),
    ).where(F.length("_b") > 0)
    lines = blocks.withColumn("_l", F.split("_b", "\n"))
    g = [F.regexp_extract(F.element_at("_l", 2), _TIME_RE, i)
         for i in range(1, 9)]
    start_ms = (
        g[0].cast("bigint") * 3600000 + g[1].cast("bigint") * 60000
        + g[2].cast("bigint") * 1000 + g[3].cast("bigint"))
    end_ms = (
        g[4].cast("bigint") * 3600000 + g[5].cast("bigint") * 60000
        + g[6].cast("bigint") * 1000 + g[7].cast("bigint"))
    idx_ok = (
        F.element_at("_l", 1) == (F.col("cue_idx") + 1).cast("string"))
    time_ok = g[0] != ""
    text = F.array_join(F.slice("_l", 3, MAX_CUES + 999), " ")
    ok = (idx_ok & time_ok & (end_ms > start_ms)
          & (F.size("_l") >= 3)).cast("int")
    return lines.select(
        id_col,
        F.col("cue_idx").cast("bigint").alias("cue_idx"),
        ok.alias("ok"),
        F.when(ok == 1, start_ms).otherwise(F.lit(-1)).alias("start_ms"),
        F.when(ok == 1, end_ms).otherwise(F.lit(-1)).alias("end_ms"),
        F.when(ok == 1, end_ms - start_ms).otherwise(F.lit(-1))
        .alias("dur_ms"),
        F.when(ok == 1, F.length(text)).otherwise(F.lit(-1))
        .cast("bigint").alias("n_chars"),
        F.when(ok == 1, F.md5(text)).otherwise(F.lit("")).alias("text_md5"),
    )


def align_cues_to_frames(
    cues: DataFrame,
    step_ms: int = FRAME_STEP_MS,
    grid_ms: int = ALIGN_GRID_MS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Join parsed cue intervals onto the uniform frame-sampling grid
    (the video-text pair builder's join): per doc, frames at every
    ``step_ms`` over [0, grid_ms]; each frame takes the cue whose
    [start_ms, end_ms) interval covers it, or -1 when uncovered —
    gaps, and every frame a malformed (ok=0) cue failed to claim, so
    upstream poison propagates VISIBLY through the alignment.

    Plan: the grid explodes from a per-doc sequence (no driver loop),
    then ONE left join with the doc equi key plus the interval
    predicate in the join condition — never a cartesian (the equi key
    hash-partitions both sides; the range predicate filters within
    the co-partition).  Cues are non-overlapping by contract, so the
    join is at most 1:1 per frame."""
    grid = cues.select(id_col).distinct().select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.lit(int(grid_ms)), F.lit(int(step_ms)))
        ).alias("_t"),
    ).select(id_col, F.col("_t").cast("bigint").alias("t_ms"))
    live = cues.where(F.col("ok") == 1).select(
        F.col(id_col).alias("_d"), "cue_idx", "start_ms", "end_ms")
    j = grid.join(
        live,
        (grid[id_col] == live["_d"])
        & (grid["t_ms"] >= live["start_ms"])
        & (grid["t_ms"] < live["end_ms"]),
        "left",
    )
    return j.select(
        id_col, "t_ms",
        F.coalesce("cue_idx", F.lit(-1)).cast("bigint").alias("cue_idx"),
    )


# ---------------------------------------------------------------------------
# WebVTT dialect (the web's caption format — W3C spec, public):
# a WEBVTT header block, OPTIONAL per-cue identifier lines, dot
# milliseconds, an optional-hours timestamp form, and cue settings
# after the end timestamp.  Shares the block discipline with SRT.
# ---------------------------------------------------------------------------

_VTT_TIME_RE = (
    r"^(?:(\d{2,3}):)?(\d{2}):(\d{2})\.(\d{3}) --> "
    r"(?:(\d{2,3}):)?(\d{2}):(\d{2})\.(\d{3})( .*)?$"
)


def synth_vtt(doc_id_col, text_col):
    """Deterministic WebVTT per doc (same cue arithmetic as
    :func:`synth_srt` so the two dialects' parsers are directly
    comparable): a WEBVTT header block; cue k carries an identifier
    line only when k is even (the optional-id branch), uses the
    HOURLESS 'MM:SS.mmm' form when k == 0 (both branches of the
    optional-hours regex), and appends ' align:start' settings when
    k % 3 == 0 (the settings tail must not break end-timestamp
    parsing).  id%23==1 docs malform cue 1's arrow.  Twin:
    :func:`synth_vtt_sql`."""
    d = doc_id_col
    clean = F.regexp_replace(
        F.coalesce(text_col, F.lit("")), "[\\n\\r]", " ")
    off = (d % 7) * 111
    dur = F.lit(1500) + (d % 3) * 200
    n_cues = F.lit(3) + d % 4

    def vtt_ts(ms_col, hourless: bool):
        ms_col = ms_col.cast("bigint")
        p2 = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
        mm_ss = F.concat(
            p2(F.floor(ms_col / 60000).cast("bigint") % 60), F.lit(":"),
            p2(F.floor(ms_col / 1000).cast("bigint") % 60), F.lit("."),
            F.lpad((ms_col % 1000).cast("string"), 3, "0"),
        )
        if hourless:
            return mm_ss
        return F.concat(
            p2(F.floor(ms_col / 3600000).cast("bigint")), F.lit(":"), mm_ss)

    blocks = [F.lit("WEBVTT")]
    for k in range(MAX_CUES):
        start = F.lit(k * CUE_SPACING_MS) + off
        arrow = F.when(
            (d % 23 == 1) & (F.lit(k) == 1), F.lit(" -> ")
        ).otherwise(F.lit(" --> "))
        ident = F.lit(f"c{k + 1}\n" if k % 2 == 0 else "")
        settings = F.lit(" align:start" if k % 3 == 0 else "")
        block = F.concat(
            F.lit("\n\n"), ident,
            vtt_ts(start, k == 0), arrow, vtt_ts(start + dur, k == 0),
            settings, F.lit("\n"),
            F.lit(f"cue {k + 1}: "),
            F.substring(clean, 1 + k * 17, 23),
        )
        blocks.append(F.when(F.lit(k) < n_cues, block).otherwise(F.lit("")))
    return F.concat(*blocks)


def synth_vtt_sql(text_expr: str = "coalesce(text, '')",
                  id_expr: str = "doc_id") -> str:
    """DuckDB expression rebuilding :func:`synth_vtt` byte-identically."""
    clean = f"regexp_replace({text_expr}, '[\\n\\r]', ' ', 'g')"

    def ts(ms: str, hourless: bool) -> str:
        mm_ss = (
            f"lpad(CAST((({ms}) // 60000) % 60 AS VARCHAR), 2, '0') || ':' || "
            f"lpad(CAST((({ms}) // 1000) % 60 AS VARCHAR), 2, '0') || '.' || "
            f"lpad(CAST(({ms}) % 1000 AS VARCHAR), 3, '0')"
        )
        if hourless:
            return mm_ss
        return (
            f"lpad(CAST(({ms}) // 3600000 AS VARCHAR), 2, '0') || ':' || "
            + mm_ss
        )

    parts = ["'WEBVTT'"]
    for k in range(MAX_CUES):
        start = f"({k * CUE_SPACING_MS} + ({id_expr} % 7) * 111)"
        end = f"({start} + 1500 + ({id_expr} % 3) * 200)"
        arrow = (
            f"CASE WHEN {id_expr} % 23 = 1 AND {k} = 1 "
            f"THEN ' -> ' ELSE ' --> ' END"
        )
        ident = (f"'c{k + 1}' || e'\\n' || " if k % 2 == 0 else "")
        settings = ("' align:start' || " if k % 3 == 0 else "")
        block = (
            f"e'\\n\\n' || {ident}{ts(start, k == 0)} || {arrow} || "
            f"{ts(end, k == 0)} || {settings}e'\\n' || "
            f"'cue {k + 1}: ' || substr({clean}, {1 + k * 17}, 23)"
        )
        parts.append(
            f"CASE WHEN {k} < 3 + {id_expr} % 4 THEN {block} ELSE '' END")
    return "(" + " || ".join(parts) + ")"


def parse_vtt_cues(
    df: DataFrame, vtt_col: str = "vtt", id_col: str = "doc_id"
) -> DataFrame:
    """WebVTT -> one row per cue: the same output contract as
    :func:`parse_srt_cues` (doc_id, cue_idx, ok, start_ms, end_ms,
    dur_ms, n_chars, text_md5), ALL CODEGEN.  Handles the header
    block (cue_idx counts CUES, not blocks), optional identifier
    lines (the timing line is found by its arrow, not its position),
    optional hours, and cue settings after the end timestamp.
    A stream whose first block is not WEBVTT degrades every cue
    (ok=0) — header validation is part of the contract.  Stateless:
    streams as-is."""
    blocks = df.select(
        F.col(id_col),
        F.when(
            F.split(F.col(vtt_col), "\n\n")[0].startswith("WEBVTT"),
            F.lit(1)).otherwise(F.lit(0)).alias("_hdr_ok"),
        F.posexplode(F.split(F.col(vtt_col), "\n\n")).alias("_pos", "_b"),
    ).where((F.col("_pos") > 0) & (F.length("_b") > 0))
    lines = blocks.withColumn("_l", F.split("_b", "\n"))
    l1 = F.element_at("_l", 1)
    has_id = ~l1.contains(" --> ")
    tline = F.when(has_id, F.element_at("_l", 2)).otherwise(l1)
    text_from = F.when(has_id, F.lit(3)).otherwise(F.lit(2))
    g = [F.regexp_extract(tline, _VTT_TIME_RE, i) for i in range(1, 9)]

    def ms(h, m, s, f3):
        hh = F.when(h == "", F.lit(0)).otherwise(h.cast("bigint"))
        return (hh * 3600000 + m.cast("bigint") * 60000
                + s.cast("bigint") * 1000 + f3.cast("bigint"))

    start_ms = ms(g[0], g[1], g[2], g[3])
    end_ms = ms(g[4], g[5], g[6], g[7])
    time_ok = g[1] != ""
    text = F.array_join(
        F.slice("_l", text_from, MAX_CUES + 999), " ")
    n_lines_ok = F.size("_l") >= text_from
    ok = ((F.col("_hdr_ok") == 1) & time_ok & (end_ms > start_ms)
          & n_lines_ok).cast("int")
    return lines.select(
        id_col,
        (F.col("_pos") - 1).cast("bigint").alias("cue_idx"),
        ok.alias("ok"),
        F.when(ok == 1, start_ms).otherwise(F.lit(-1)).alias("start_ms"),
        F.when(ok == 1, end_ms).otherwise(F.lit(-1)).alias("end_ms"),
        F.when(ok == 1, end_ms - start_ms).otherwise(F.lit(-1))
        .alias("dur_ms"),
        F.when(ok == 1, F.length(text)).otherwise(F.lit(-1))
        .cast("bigint").alias("n_chars"),
        F.when(ok == 1, F.md5(text)).otherwise(F.lit("")).alias("text_md5"),
    )
