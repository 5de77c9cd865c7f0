"""Sources & sinks (SURVEY.md §2 E1 + the quads persistence contract).

The reference keeps everything in one in-memory map (gun/storage.go).
Our durable layout is parquet with an explicit 100 TB posture:

- ``write_quads`` buckets rows by ``hash(soul) % n_buckets`` into a
  partition column, so (a) path-traversal joins on soul co-locate by
  partition, (b) point reads prune to one bucket directory, (c) the
  HAM-merge shuffle can be avoided entirely when both sides share the
  bucketing.  (Hive-style bucketed tables would use the metastore; a
  plain-directory layout keeps the same join locality via partition
  pruning without one.)
- ``read_quads`` prunes by bucket when a soul is given.
- ``read_any`` is the generic format front-door (parquet/json/csv).

**Atomic commits (round 5).**  The store is a SNAPSHOT-MANIFEST layout
(Iceberg's core idea, sized down): data files live in immutable
``commits/c<seq>/`` directories; ``_quads_meta.json`` is the single
source of truth mapping each bucket (and the deferred-update pending
set) to the commit that last wrote it.  Writers stage a whole commit
directory first and then publish with one atomic manifest rename
(``os.replace`` — swap for a conditional PUT on an object store), so a
crash at ANY point leaves readers on the previous consistent snapshot:
bucket data and the pending set can never be observed half-updated
(the r4 VERDICT crash-window finding).  Readers resolve live bucket
directories through the manifest, which also makes point-read pruning
a direct path lookup instead of a partition filter.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esgopeta_spark.types import QUAD_SCHEMA

DEFAULT_BUCKETS = 64
MANIFEST = "_quads_meta.json"


def _bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64("soul"), F.lit(n_buckets)).alias("soul_bucket")


def load_manifest(path: str) -> dict | None:
    """The store manifest, or None if the store doesn't exist yet."""
    try:
        with open(os.path.join(path, MANIFEST)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def publish_manifest(path: str, manifest: dict) -> None:
    """Atomically swap the manifest in — the store's only commit point.
    POSIX rename is atomic; an object-store deployment swaps this for a
    conditional PUT (if-match on the previous manifest etag)."""
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST))


def gc_unreferenced_commits(path: str, manifest: dict) -> None:
    """Best-effort removal of commit dirs the manifest no longer
    references.  Safe under a single writer (foreachBatch serializes
    batches); a multi-reader deployment would keep the last K snapshots
    instead so in-flight scans never lose files under them."""
    live = {c.split("/")[1] for c in manifest["buckets"].values()}
    if manifest.get("pending"):
        live.add(manifest["pending"].split("/")[1])
    commits_dir = os.path.join(path, "commits")
    if not os.path.isdir(commits_dir):
        return
    for d in os.listdir(commits_dir):
        if d not in live:
            shutil.rmtree(os.path.join(commits_dir, d), ignore_errors=True)


def legacy_bucket_dirs(path: str) -> list[str]:
    """Root-level ``soul_bucket=*`` dirs of a pre-manifest flat store.
    Readers of legacy stores must target these explicitly: a bare root
    scan breaks (mixed-depth partition discovery) once any commits/
    staging tree exists — e.g. after a crashed upgrade attempt."""
    if not os.path.isdir(path):
        return []
    return sorted(
        os.path.join(path, d) for d in os.listdir(path) if d.startswith("soul_bucket=")
    )


def live_bucket_paths(path: str, manifest: dict, buckets=None) -> list[str]:
    """Absolute live data directories, optionally restricted to a bucket
    subset (point reads / bucket-local rewrite)."""
    out = []
    for b, rel in sorted(manifest["buckets"].items(), key=lambda kv: int(kv[0])):
        if buckets is None or int(b) in buckets:
            out.append(os.path.join(path, rel))
    return out


def write_quads(quads: DataFrame, path: str, n_buckets: int = DEFAULT_BUCKETS, mode: str = "overwrite") -> None:
    if mode != "overwrite":
        raise ValueError("write_quads commits whole snapshots; mode must be 'overwrite'")
    prev = load_manifest(path)
    seq = (prev.get("seq", -1) + 1) if prev else 0  # legacy meta has no seq
    cid = f"c{seq:06d}"
    data_dir = os.path.join(path, "commits", cid, "data")
    (
        quads.withColumn("soul_bucket", _bucket_expr(n_buckets))
        .repartition("soul_bucket")
        .write.mode("overwrite")
        .partitionBy("soul_bucket")
        .parquet(data_dir)
    )
    written = [
        int(d.split("=", 1)[1])
        for d in os.listdir(data_dir)
        if d.startswith("soul_bucket=")
    ]
    # the bucket count is part of the layout; persist it so readers can't
    # silently prune with the wrong modulus
    manifest = {
        "n_buckets": n_buckets,
        "seq": seq,
        "buckets": {str(b): f"commits/{cid}/data/soul_bucket={b}" for b in written},
        "pending": None,
    }
    publish_manifest(path, manifest)
    gc_unreferenced_commits(path, manifest)
    if prev is not None and "buckets" not in prev:
        # overwrote a legacy flat-layout store: its root-level bucket dirs
        # are fully superseded by this snapshot (best-effort cleanup)
        for d in os.listdir(path):
            if d.startswith("soul_bucket=") or d == "_pending":
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def _empty_quads(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], QUAD_SCHEMA)


def read_quads(spark: SparkSession, path: str, soul: str | None = None) -> DataFrame:
    cols = [f.name for f in QUAD_SCHEMA.fields]
    manifest = load_manifest(path)
    if manifest is None or "buckets" not in manifest:
        # legacy flat layout (pre-manifest stores).  Explicit leaf dirs,
        # never a bare root scan: an orphaned commits/ staging tree from
        # a crashed upgrade must not break reads (mixed-depth discovery)
        leaf = legacy_bucket_dirs(path)
        if leaf:
            df = spark.read.schema(QUAD_SCHEMA).parquet(*leaf)
        else:
            df = spark.read.parquet(path)  # unpartitioned legacy write
        if soul is not None:
            df = df.filter(F.col("soul") == soul)
        return df.select(cols)
    if soul is not None:
        # point read: the manifest resolves the soul's bucket to ONE live
        # directory — pruning by path, no partition filter needed
        row = spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(soul)), F.lit(manifest["n_buckets"])).alias("b")
        ).collect()
        paths = live_bucket_paths(path, manifest, {int(row[0]["b"])})
        if not paths:
            return _empty_quads(spark)
        return spark.read.parquet(*paths).filter(F.col("soul") == soul).select(cols)
    paths = live_bucket_paths(path, manifest)
    if not paths:
        return _empty_quads(spark)
    return spark.read.parquet(*paths).select(cols)


def read_any(spark: SparkSession, path: str, fmt: str | None = None, schema=None, **options) -> DataFrame:
    """Generic scan front-door; format inferred from the extension when
    not given.  Keep scans bare so pushdown reaches the files."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet"}.get(ext, ext or "parquet")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", schema is None)
    return reader.options(**options).format(fmt).load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    repartition_by_partition_cols: bool = True,
    **options,
) -> None:
    """Generic sink front-door (parquet/orc/json/csv).

    ``partition_by`` lays out Hive-style partition directories —
    downstream scans filtering on those columns prune whole directories.
    When partitioning, the frame is first repartitioned ON the partition
    columns: without it every task writes a file into every partition
    directory (tasks x partitions small files, the classic sink
    mistake); with it each partition directory gets one file per key
    slice.  Set ``repartition_by_partition_cols=False`` when the frame
    is already clustered (e.g. straight out of a groupBy on the same
    keys).
    """
    if fmt == "csv":
        options.setdefault("header", "true")
    out = df
    if partition_by and repartition_by_partition_cols:
        out = out.repartition(*[F.col(c) for c in partition_by])
    writer = out.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def sniff_format_expr(c):
    """Codegen'd Spark twin of :func:`esgopeta_spark.operators.codecs.
    sniff_format` over a binary column — magic sniff as binary-prefix
    comparisons, no Python UDF in the ingest path.  When-order mirrors the
    python twin's precedence exactly (magics, then ISO-BMFF ftyp, then the
    field-validated bare MPEG frame sync — r7 ADVICE: ordering divergence)
    and is pinned against the python twin case-by-case in
    tests/test_sources.py::test_sniff_format_expr_matches_python_twin.

    Differences from the python twin, both collapsing to kind='other':
    RIFF-non-WAVE reports 'unknown' here vs 'riff-other', and empty
    payloads report 'unknown' vs 'empty'.
    """
    from pyspark.sql import functions as F

    def _byte_int(col, pos):  # 1-based byte of a binary column as int 0-255
        return F.conv(F.hex(col.substr(pos, 1)), 16, 10).cast("int")

    return (
        F.when(c.substr(1, 8) == F.lit(b"\x89PNG\r\n\x1a\n"), "png")
        .when(c.substr(1, 3) == F.lit(b"\xff\xd8\xff"), "jpeg")
        .when((c.substr(1, 6) == F.lit(b"GIF87a")) | (c.substr(1, 6) == F.lit(b"GIF89a")), "gif")
        .when(c.substr(1, 2) == F.lit(b"BM"), "bmp")
        .when(c.substr(1, 2) == F.lit(b"P6"), "ppm")
        .when(c.substr(1, 5) == F.lit(b"%PDF-"), "pdf")
        .when((c.substr(1, 4) == F.lit(b"II*\x00")) | (c.substr(1, 4) == F.lit(b"MM\x00*")), "tiff")
        .when((c.substr(1, 4) == F.lit(b"RIFF")) & (c.substr(9, 4) == F.lit(b"WAVE")), "wav")
        # RIFF-non-WAVE must TERMINATE here like the python twin's
        # 'riff-other' (normalized to unknown): without this arm an AVI
        # whose little-endian size bytes spell 'ftyp' would fall through
        # to the mp4 branch (r8 review)
        .when(c.substr(1, 4) == F.lit(b"RIFF"), "unknown")
        .when(c.substr(1, 3) == F.lit(b"ID3"), "mp3")
        .when((F.length(c) >= 12) & (c.substr(5, 4) == F.lit(b"ftyp")), "mp4")
        # bare MPEG frame sync, validated field-by-field like the python
        # sniff_format twin (r6 ADVICE) — byte→int via hex/conv keeps the
        # nibble checks codegen'd, no UDF: b1 top-3 bits set + version &
        # layer not reserved; b2 bitrate not free/bad + rate not reserved
        .when(
            (c.substr(1, 1) == F.lit(b"\xff"))
            & (_byte_int(c, 2) >= 224)
            & ((_byte_int(c, 2) / 8).cast("int") % 4 != 1)
            & ((_byte_int(c, 2) / 2).cast("int") % 4 != 0)
            & (_byte_int(c, 3) / 16).cast("int").between(1, 14)
            & ((_byte_int(c, 3) / 4).cast("int") % 4 != 3),
            "mp3",
        )
        .otherwise("unknown")
    )


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory of raw media files as the MEDIA_SCHEMA-shaped
    relation the multimodal kernels consume, via Spark's ``binaryFile``
    source — the standard way media corpora enter a lakehouse (one row
    per file: path, length, modification time, content).

    media_id is the xxhash64 of the file path: stable across re-reads,
    independent of listing order, and collision-safe at corpus scale
    far beyond file counts.  ``kind`` is sniffed from the payload magic
    (image/audio/video/other), so the frame works on mixed directories.
    Column pruning applies: a query that never touches ``payload`` reads
    file metadata only (binaryFile skips content IO for unprojected
    content columns).
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    fmt = sniff_format_expr(F.col("content"))
    kind = (
        F.when(fmt.isin("bmp", "ppm", "png", "jpeg", "gif", "tiff"), F.lit("image"))
        .when(fmt.isin("wav", "mp3"), F.lit("audio"))
        .when(fmt == "mp4", F.lit("video"))
        .otherwise(F.lit("other"))
    )
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        # the exact MEDIA_SCHEMA meta struct the downstream kernels read
        # (resize_media decode path, frame_sample_plan meta.duration_ms):
        # dims/rates are unknown at ingest — decode_media fills them —
        # but the struct SHAPE must match or those kernels fail
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            fmt.alias("format"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Hive-bucketed managed table: co-partitioned by
    ``bucket_col`` into ``n_buckets`` files per partition (optionally
    sorted within buckets).  Two tables bucketed the same way JOIN WITH
    NO EXCHANGE on the bucket key — the single biggest shuffle
    eliminator for a repeatedly-joined 100 TB fact/dim pair (the shuffle
    is paid ONCE at write time, then every downstream join is co-located;
    pinned by tests/test_sources.py::test_bucketed_join_has_no_exchange).

    Uses ``saveAsTable`` (bucket metadata lives in the session catalog /
    metastore — plain parquet paths cannot carry it); on a real cluster
    the warehouse dir + metastore make this durable across sessions.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compaction_plan(
    files: DataFrame,
    part_col: str = "part",
    id_col: str = "file_id",
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file COMPACTION planning — the table-maintenance op every
    100 TB lakehouse runs nightly (a day of streaming commits leaves
    thousands of KB-scale files per partition; scans then pay per-file
    open cost): within each partition, files are taken in deterministic
    id order and packed greedily by cumulative size —

        merge_group = (running_sum_before_this_file) div target

    — a pure-window quotient pack: every group lands within one file of
    ``target_bytes`` (a file straddling a boundary joins the earlier
    group), no per-group sequential state, so the plan itself is one
    window over the manifest, not a driver loop.  Emits one row per
    input file with its (partition, merge_group) assignment plus the
    group's total bytes and file count — the work order a compactor
    executes.  Single-file groups whose file already exceeds the target
    are left alone by the executor (they're already compact); the plan
    marks them ``already_compact = 1``.

    Scale shape: manifests are rows-about-files (millions of rows for
    billions of data rows), so the two windows here — the running sum
    and the per-group rollup — cost nothing at any table size; both key
    on the partition column the manifest is naturally clustered by."""
    w = Window.partitionBy(part_col).orderBy(F.col(id_col).asc())
    before = F.coalesce(
        F.sum(bytes_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    planned = files.select(
        F.col(part_col),
        F.col(id_col),
        F.col(bytes_col).cast("bigint").alias(bytes_col),
        before.cast("bigint").alias("_before"),
    ).select(
        F.col(part_col),
        F.col(id_col),
        F.col(bytes_col),
        # pure-integer quotient (house discipline: no float `/` crosses
        # an oracle boundary — a double rounds cumulative bytes past
        # 2^53 and can mis-assign a group vs DuckDB's exact `//`).
        # _before >= 0, so DIV truncation == floor == the oracle.
        F.expr(f"_before DIV {int(target_bytes)}").cast("bigint")
        .alias("merge_group"),
    )
    gw = Window.partitionBy(part_col, "merge_group")
    return planned.select(
        part_col,
        id_col,
        bytes_col,
        "merge_group",
        F.sum(bytes_col).over(gw).cast("bigint").alias("group_bytes"),
        F.count("*").over(gw).cast("bigint").alias("group_files"),
        (
            (F.count("*").over(gw) == 1)
            & (F.col(bytes_col) >= F.lit(int(target_bytes)))
        ).cast("int").alias("already_compact"),
    )
