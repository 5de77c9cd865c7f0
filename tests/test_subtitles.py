"""SRT subtitle parsing + frame alignment (r14): the synth twin's
byte-equality across engines, parser degradation classes (the
TOTAL-kernel doctrine: malformed cues degrade to visible rows, never
raise), multi-line cue text, the alignment join's plan posture (equi
key + interval predicate, never a cartesian), and stateless
stream-as-is behavior."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from esgopeta_spark.operators.subtitles import (
    align_cues_to_frames,
    parse_srt_cues,
    synth_srt,
    synth_srt_sql,
)
from esgopeta_spark.session import read_table


def test_synth_twin_byte_identical(spark):
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: r["srt"]
        for r in docs.select(
            "doc_id", synth_srt(F.col("doc_id"), F.col("text")).alias("srt")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        "'/root/testdata/sf0.001/documents.parquet'")
    want = dict(
        con.execute(
            f"select doc_id, {synth_srt_sql()} from documents").fetchall())
    assert got == want


def _parse_one(spark, srt: str):
    df = spark.createDataFrame([(0, srt)], "doc_id: long, srt: string")
    return sorted(
        (r["cue_idx"], r["ok"], r["start_ms"], r["end_ms"], r["n_chars"])
        for r in parse_srt_cues(df).collect()
    )


def test_parser_degradation_classes(spark):
    """Each malformation class degrades its own cue to (ok=0, -1s) and
    leaves the neighbors parsed — never an exception."""
    good = "1\n00:00:00,000 --> 00:00:01,500\nhello world"
    assert _parse_one(spark, good) == [(0, 1, 0, 1500, 11)]
    # multi-line cue text joins with a space
    multi = "1\n00:00:00,000 --> 00:00:01,500\nhello\nworld"
    assert _parse_one(spark, multi) == [(0, 1, 0, 1500, 11)]
    # bad arrow
    bad_arrow = "1\n00:00:00,000 -> 00:00:01,500\nx"
    assert _parse_one(spark, bad_arrow)[0][1] == 0
    # index line disagrees with block position
    bad_idx = "7\n00:00:00,000 --> 00:00:01,500\nx"
    assert _parse_one(spark, bad_idx)[0][1] == 0
    # reversed interval
    rev = "1\n00:00:02,000 --> 00:00:01,000\nx"
    assert _parse_one(spark, rev)[0][1] == 0
    # missing text line
    notext = "1\n00:00:00,000 --> 00:00:01,500"
    assert _parse_one(spark, notext)[0][1] == 0
    # second block survives a poisoned first
    two = (bad_arrow + "\n\n2\n00:00:02,000 --> 00:00:03,000\nok here")
    got = _parse_one(spark, two)
    assert got[0][1] == 0 and got[1] == (1, 1, 2000, 3000, 7)
    # hour-scale timestamps
    hours = "1\n01:02:03,456 --> 01:02:04,000\nx"
    assert _parse_one(spark, hours) == [
        (0, 1, 3723456, 3724000, 1)]


def test_alignment_poison_propagates(spark):
    """A malformed cue's interval must surface as -1 frames (uncovered),
    not silently claim them."""
    d = spark.createDataFrame([(2,), (24,)], "doc_id: long").select(
        "doc_id", synth_srt(F.col("doc_id"), F.lit("words " * 30)).alias("srt")
    )
    cues = parse_srt_cues(d)
    out = {(r["doc_id"], r["t_ms"]): r["cue_idx"]
           for r in align_cues_to_frames(cues).collect()}
    # doc 24 (24%23==1): cue 1 spans [2111+... ) — its frames read -1
    off = (24 % 7) * 111  # 333
    for t in range(0, 13001, 1000):
        k = (t - off) // 2000 if t >= off else -1
        dur = 1500 + (24 % 3) * 200
        covered = (t >= off and (t - off) % 2000 < dur
                   and 0 <= k < 3 + 24 % 4)
        want = k if covered and k != 1 else -1
        assert out[(24, t)] == want, (t, out[(24, t)], want)
    # doc 2 (not poison): cue 1 claims its frames
    grid_hits = [t for t in range(0, 13001, 1000)
                 if out[(2, t)] == 1]
    assert grid_hits, out


def test_align_plan_posture(spark, sf_dir):
    """The alignment join must be equi-keyed on the doc id with the
    interval predicate inside the join — no cartesian, no broadcast
    nested loop."""
    from tests.test_plans import plan_of
    from esgopeta_spark.plans import REGISTRY

    p = plan_of(REGISTRY["pipeline_srt_frame_align"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    assert ("SortMergeJoin" in p or "BroadcastHashJoin" in p
            or "ShuffledHashJoin" in p), p


def test_parser_streams_as_is(spark, tmp_path):
    """The parser is a stateless projection: the drained stream's rows
    equal the batch parse bit-for-bit (share, don't mirror)."""
    import os

    from tests.test_streaming import run_stream_to_memory

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    d = docs.select(
        "doc_id", synth_srt(F.col("doc_id"), F.col("text")).alias("srt"))
    want = {tuple(r) for r in parse_srt_cues(d).collect()}
    p = str(tmp_path / "srt")
    os.makedirs(p)
    d.coalesce(1).write.parquet(p + "/b0")
    stream = (
        spark.readStream.schema(d.schema)
        .option("recursiveFileLookup", "true").parquet(p)
    )
    run_stream_to_memory(parse_srt_cues(stream), "srtstream", mode="append")
    got = {tuple(r) for r in spark.sql("select * from srtstream").collect()}
    assert got == want


def _parse_vtt(spark, vtt: str):
    df = spark.createDataFrame([(0, vtt)], "doc_id: long, vtt: string")
    from esgopeta_spark.operators.subtitles import parse_vtt_cues

    return sorted(
        (r["cue_idx"], r["ok"], r["start_ms"], r["end_ms"], r["n_chars"])
        for r in parse_vtt_cues(df).collect()
    )


def test_vtt_parser_dialect_branches(spark):
    """Header validation, optional cue ids, the hourless timestamp
    form, settings tails, and per-cue degradation."""
    base = "WEBVTT\n\n00:01.000 --> 00:02.500\nhello"
    assert _parse_vtt(spark, base) == [(0, 1, 1000, 2500, 5)]
    # identifier line + hours form + settings tail
    full = ("WEBVTT\n\nintro\n00:00:01.000 --> 00:00:02.000 align:start\nx y")
    assert _parse_vtt(spark, full) == [(0, 1, 1000, 2000, 3)]
    # 3-digit hours
    big = "WEBVTT\n\n100:00:01.000 --> 100:00:02.000\nx"
    assert _parse_vtt(spark, big) == [
        (0, 1, 360001000, 360002000, 1)]
    # missing WEBVTT header degrades every cue
    hdrless = "NOTVTT\n\n00:01.000 --> 00:02.000\nx"
    assert all(r[1] == 0 for r in _parse_vtt(spark, hdrless))
    # SRT-style comma milliseconds are NOT valid VTT
    comma = "WEBVTT\n\n00:00:01,000 --> 00:00:02,000\nx"
    assert _parse_vtt(spark, comma)[0][1] == 0
    # a poisoned cue leaves its neighbor parsed
    two = ("WEBVTT\n\n00:01.000 -> 00:02.000\nbad"
           "\n\n00:03.000 --> 00:04.000\ngood")
    got = _parse_vtt(spark, two)
    assert got[0][1] == 0 and got[1] == (1, 1, 3000, 4000, 4)


def test_vtt_synth_twin_byte_identical(spark):
    from esgopeta_spark.operators.subtitles import synth_vtt, synth_vtt_sql

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: r["v"]
        for r in docs.select(
            "doc_id", synth_vtt(F.col("doc_id"), F.col("text")).alias("v")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        "'/root/testdata/sf0.001/documents.parquet'")
    want = dict(
        con.execute(
            f"select doc_id, {synth_vtt_sql()} from documents").fetchall())
    assert got == want
