"""Streaming near-duplicate detection (r9): MinHash-LSH over a document
stream — every arriving doc is checked against the ENTIRE history seen
so far, the way a production ingest dedupes against its corpus.

The batch pipeline's candidate generation is already stream-safe: the
shingle/band hashing is JVM xxhash64 and the k-family min-fold is an
Arrow pandas_udf, all stateless projections (`dedup.banded_signatures`
is shared by both paths, so batch and stream produce bit-identical band
keys).  Only the pair step changes shape: the batch self-join becomes a
stateful bucket handler (`applyInPandasWithState` keyed by
(band, band_hash)) whose state is the sorted id list of every doc seen
in that bucket; a new arrival emits (old, new) pairs against the
resident ids plus the new-vs-new pairs, so each colliding pair is
emitted exactly once per bucket — the union over buckets equals the
batch candidate set under ANY arrival order (pinned in
tests/test_streaming.py).  A pair colliding in several bands is emitted
once per band, like the batch join before its ``distinct()``; dedupe
downstream (``dropDuplicates`` with a watermark, or the consumer's
upsert) — noted per the no-silent-caps rule.

Scale shape: the state store IS the corpus index — Σ_bucket |ids| =
bands × n_docs longs, exactly what any streaming dedup service keeps
(RocksDB state store on a real cluster); the per-bucket emission is
linear in collisions, never all-pairs.  Hot buckets (boilerplate
shingle profiles) concentrate state exactly like hot keys in the batch
join — cap them with ``max_bucket`` (emission stops; a capped marker
row is re-emitted on EVERY batch that drops docs so the cap stays
VISIBLE for the stream's whole life, never silent).  For a
months-long production stream, ``max_age`` bounds the state store by
evicting residents older than that many bucket arrivals
(LRU-by-resident-age) — again with a visible per-eviction marker row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

MINHASH_STATE_SCHEMA = StructType(
    [
        StructField("ids_json", StringType()),
        StructField("n_seen", LongType()),
    ]
)

MINHASH_PAIRS_SCHEMA = "band int, bh bigint, id_a bigint, id_b bigint"


def _make_bucket_handler(max_bucket: int, max_age: int = 0):
    import json as _json

    def handler(key, pdfs, gstate):
        band, bh = key
        new = []
        for pdf in pdfs:
            new.extend(int(v) for v in pdf["_id"])
        if not new:
            return
        import pandas as _pd

        if gstate.exists:
            st = gstate.get
            # residents are [id, admit_seq] pairs; admit_seq is the bucket's
            # logical clock (n_seen at admission) used for age eviction
            res = [(int(r[0]), int(r[1])) for r in _json.loads(st[0])]
            n_seen = int(st[1])
        else:
            res, n_seen = [], 0
        resident_ids = {i for i, _ in res}
        new = sorted(set(new) - resident_ids)
        n_total = n_seen + len(new)
        rows = []
        if max_age > 0:
            # LRU-by-resident-age: evict residents admitted more than
            # max_age arrivals ago — bounds state for a long-running
            # stream; the eviction is VISIBLE (id_a = -2 marker with the
            # evicted count), never silent
            kept = [(i, s) for i, s in res if s >= n_total - max_age]
            if len(kept) < len(res):
                rows.append({"band": int(band), "bh": int(bh),
                             "id_a": -2, "id_b": len(res) - len(kept)})
            res = kept
        ids = [i for i, _ in res]
        if max_bucket > 0:
            admit = new[: max(max_bucket - len(ids), 0)]
        else:
            admit = new
        for i, b in enumerate(admit):
            for a in ids:
                rows.append({"band": int(band), "bh": int(bh),
                             "id_a": min(a, b), "id_b": max(a, b)})
            for a in admit[:i]:
                rows.append({"band": int(band), "bh": int(bh),
                             "id_a": a, "id_b": b})
        if len(admit) < len(new):
            # this batch dropped docs: re-emit the visible marker row
            # (id_a = -1, id_b = running bucket total) on EVERY dropping
            # batch — never only the first crossing — so the truncation
            # stays observable for the stream's whole life
            rows.append({"band": int(band), "bh": int(bh),
                         "id_a": -1, "id_b": n_total})
        res = sorted(set(res) | {(b, n_total) for b in admit})
        gstate.update((_json.dumps(res), n_total))
        if rows:
            yield _pd.DataFrame(rows)

    return handler


def streaming_minhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket: int = 0,
    max_age: int = 0,
) -> DataFrame:
    """Streaming docs (id, text) -> append stream of LSH candidate pairs
    (band, bh, id_a, id_b) with id_a < id_b; see module docstring.
    ``max_bucket`` > 0 stops pair emission for buckets beyond that many
    resident docs (hot-bucket guard) and emits an (id_a=-1,
    id_b=running_bucket_total) marker row on every batch that drops
    docs.  ``max_age`` > 0 evicts residents admitted more than that many
    bucket arrivals ago (LRU-by-resident-age — bounds the state store
    for a months-long production stream); each eviction emits a visible
    (id_a=-2, id_b=n_evicted) marker row.  Defaults keep the exact
    batch≡stream contract (no cap, no eviction)."""
    from esgopeta_spark.operators.dedup import banded_signatures

    banded = banded_signatures(
        docs, text_col, id_col, num_hashes, bands, shingle_n, vectorized=True
    )
    return banded.groupBy("band", "bh").applyInPandasWithState(
        _make_bucket_handler(max_bucket, max_age),
        outputStructType=MINHASH_PAIRS_SCHEMA,
        stateStructType=MINHASH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HAMMING_STATE_SCHEMA = StructType(
    [
        StructField("rows_json", StringType()),
        StructField("n_seen", LongType()),
    ]
)

HAMMING_PAIRS_SCHEMA = "id_a bigint, id_b bigint, hamming int"


def _make_hamming_handler(max_hamming: int, max_bucket: int, max_age: int = 0):
    import json as _json

    def handler(key, pdfs, gstate):
        new = []
        for pdf in pdfs:
            new.extend((int(i), int(f)) for i, f in zip(pdf["_id"], pdf["_fp"]))
        if not new:
            return
        import pandas as _pd

        if gstate.exists:
            st = gstate.get
            # residents are [id, fp, admit_seq] triples (see
            # _make_bucket_handler for the admit_seq age-eviction clock)
            res = [(int(r[0]), int(r[1]), int(r[2])) for r in _json.loads(st[0])]
            n_seen = int(st[1])
        else:
            res, n_seen = [], 0
        seen_ids = {i for i, _, _ in res}
        new = sorted({(i, f) for i, f in new if i not in seen_ids})
        n_total = n_seen + len(new)
        rows = []
        if max_age > 0:
            kept = [t for t in res if t[2] >= n_total - max_age]
            if len(kept) < len(res):
                rows.append({"id_a": -2, "id_b": len(res) - len(kept),
                             "hamming": -2})
            res = kept
        admit = new[: max(max_bucket - len(res), 0)] if max_bucket > 0 else new
        for i, (b, bf) in enumerate(admit):
            for a, af, _s in res:
                d = bin((af ^ bf) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    rows.append({"id_a": min(a, b), "id_b": max(a, b), "hamming": d})
            for a, af in admit[:i]:
                d = bin((af ^ bf) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    rows.append({"id_a": min(a, b), "id_b": max(a, b), "hamming": d})
        if len(admit) < len(new):
            # marker re-emitted on EVERY dropping batch (see
            # _make_bucket_handler)
            rows.append({"id_a": -1, "id_b": n_total, "hamming": -1})
        res = sorted(set(res) | {(i, f, n_total) for i, f in admit})
        gstate.update((_json.dumps(res), n_total))
        if rows:
            yield _pd.DataFrame(rows)

    return handler


def streaming_hamming_pairs(
    fps: DataFrame,
    max_hamming: int = 3,
    id_col: str = "_id",
    fp_col: str = "_fp",
    max_bucket: int = 0,
    max_age: int = 0,
) -> DataFrame:
    """Streaming twin of ``dedup.banded_hamming_pairs`` for ANY 64-bit
    fingerprint stream (SimHash text, dHash images, spectral audio —
    the whole shared Hamming family): band each fingerprint into the
    same 4×16-bit pigeonhole chunks, key the state store by
    (chunk, value), keep (id, fp) residents per bucket, and emit
    EXACT-verified pairs (hamming ≤ ``max_hamming``) as later members
    arrive.  Distinct-set of emissions equals the batch operator's
    output under any arrival order (a pair within distance d ≤ 3 shares
    ≥1 chunk, so some bucket sees both members) — pinned in
    tests/test_streaming.py.  Same visible hot-bucket cap (marker row
    id_a=-1, hamming=-1, re-emitted per dropping batch) and
    ``max_age`` eviction (marker id_a=-2, hamming=-2) contracts as
    ``streaming_minhash_pairs``."""
    from pyspark.sql import functions as F

    chunks = fps.select(
        F.col(id_col).alias("_id"),
        F.col(fp_col).alias("_fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright(F.col(fp_col), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("v"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("_id", "_fp", "ch.c", "ch.v")
    return chunks.groupBy("c", "v").applyInPandasWithState(
        _make_hamming_handler(max_hamming, max_bucket, max_age),
        outputStructType=HAMMING_PAIRS_SCHEMA,
        stateStructType=HAMMING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 0,
    max_age: int = 0,
) -> DataFrame:
    """SimHash near-dup over a document stream: the 64-bit fingerprint
    is the batch expression (`dedup.simhash64`, codegen — stream-safe),
    pairs via :func:`streaming_hamming_pairs`."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.dedup import simhash64

    fp = docs.select(
        F.col(id_col).alias("_id"), simhash64(F.col(text_col)).alias("_fp")
    )
    return streaming_hamming_pairs(
        fp, max_hamming, max_bucket=max_bucket, max_age=max_age
    )


EDIT_STATE_SCHEMA = StructType(
    [
        StructField("rows_json", StringType()),
        StructField("n_seen", LongType()),
    ]
)

EDIT_PAIRS_SCHEMA = "id_a bigint, id_b bigint, dist int"


def _make_edit_handler(max_dist: int, max_bucket: int):
    import json as _json

    def _lev(a: str, b: str) -> int:
        if abs(len(a) - len(b)) > max_dist:
            return max_dist + 1
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    def handler(key, pdfs, gstate):
        # rows: (_id, _t, role); a doc may appear with both roles in one
        # bucket (its own o=0/d=0 probe key equals its index key)
        new: dict[int, tuple[str, int]] = {}
        for pdf in pdfs:
            for i, t, r in zip(pdf["_id"], pdf["_t"], pdf["role"]):
                i = int(i)
                prev = new.get(i)
                new[i] = (t, (prev[1] if prev else 0) | int(r))
        if not new:
            return
        import pandas as _pd

        if gstate.exists:
            st = gstate.get
            res = {int(k): (v[0], int(v[1])) for k, v in _json.loads(st[0]).items()}
            n_seen = int(st[1])
        else:
            res, n_seen = {}, 0
        new = {i: v for i, v in new.items() if i not in res}
        n_total = n_seen + len(new)
        admit_n = max(max_bucket - len(res), 0) if max_bucket > 0 else len(new)
        admit = dict(sorted(new.items())[:admit_n])
        rows = []

        def emit(ia, ta, ra, ib, tb, rb):
            # a pair needs complementary roles (index meets probe)
            if not ((ra & 1 and rb & 2) or (ra & 2 and rb & 1)):
                return
            d = _lev(ta, tb)
            if d <= max_dist:
                rows.append({"id_a": min(ia, ib), "id_b": max(ia, ib), "dist": d})

        admitted = list(admit.items())
        for j, (ib, (tb, rb)) in enumerate(admitted):
            for ia, (ta, ra) in res.items():
                emit(ia, ta, ra, ib, tb, rb)
            for ia, (ta, ra) in admitted[:j]:
                emit(ia, ta, ra, ib, tb, rb)
        if len(admit) < len(new):
            rows.append({"id_a": -1, "id_b": n_total, "dist": -1})
        res.update(admit)
        gstate.update((_json.dumps(res), n_total))
        if rows:
            yield _pd.DataFrame(rows)

    return handler


def streaming_edit_pairs(
    docs: DataFrame,
    text_col: str = "title",
    id_col: str = "doc_id",
    max_dist: int = 2,
    max_bucket: int = 0,
) -> DataFrame:
    """Streaming twin of ``dedup.edit_distance_pairs`` (the PassJoin
    fuzzy join): the batch key projection is shared verbatim
    (``edit_distance_keys`` — stateless codegen), the self-join becomes
    a stateful bucket handler keyed by (i, ell, p) whose residents are
    (id, title, rolemask); arrivals pair against residents with
    complementary roles and verify exact Levenshtein in the handler.
    Distinct-set of emissions equals the batch output under any arrival
    order (pinned in tests/test_streaming.py); a pair colliding in
    several buckets is emitted once per bucket, like the batch join
    before its distinct().  Same visible hot-bucket cap contract as the
    MinHash twin (id_a=-1 marker, re-emitted per dropping batch)."""
    from esgopeta_spark.operators.dedup import edit_distance_keys

    keyed = edit_distance_keys(docs, text_col, id_col, max_dist)
    return keyed.groupBy("i", "ell", "p").applyInPandasWithState(
        _make_edit_handler(max_dist, max_bucket),
        outputStructType=EDIT_PAIRS_SCHEMA,
        stateStructType=EDIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# r12: streaming twin of dedup.incremental_dedup — the nightly-update
# capstone's core as a LIVE loop.
# ---------------------------------------------------------------------------

INCR_DEDUP_OUTPUT_SCHEMA = (
    "doc_id bigint, status string, keeper_id bigint, upd_seq bigint"
)
INCR_DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("prior_keeper", LongType()),   # null = no store entry yet
        StructField("incr_ids", StringType()),     # json residents (pre-install)
        StructField("seq", LongType()),
    ]
)


def incremental_events(prior_store, incr, text_col="text", id_col="doc_id"):
    """Union the two batch-shaped inputs into the ONE event relation the
    stateful handler consumes: kind 0 = a keeper-store install (the
    hash's prior keeper — build ``prior_store`` with the SAME
    ``sha2(normalize_text)`` groupBy-min the batch operator derives),
    kind 1 = an increment doc.  The hash projection is literally the
    batch expression (share, don't mirror)."""
    from pyspark.sql import functions as F

    from esgopeta_spark.operators.dedup import normalize_text

    h = F.sha2(normalize_text(F.col(text_col)), 256)
    installs = prior_store.select(
        F.lit(0).alias("kind"),
        h.alias("th"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    docs = incr.select(
        F.lit(1).alias("kind"),
        h.alias("th"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return installs.unionByName(docs)


def _make_incr_dedup_handler():
    """Per-hash handler (closure, cloudpickle-by-value)."""
    import json as _json

    def verdicts(prior, ids):
        if prior is not None:
            return {d: ("dup_prior", prior) for d in ids}
        if not ids:
            return {}
        m = min(ids)
        return {d: ("new", m) if d == m else ("dup_incr", m) for d in ids}

    def handler(key, pdfs, gstate):
        installs: list[int] = []
        docs: list[int] = []
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                (installs if int(rec["kind"]) == 0 else docs).append(
                    int(rec["doc_id"])
                )
        if not installs and not docs:
            return
        import pandas as _pd

        if gstate.exists:
            st = gstate.get
            prior = None if st[0] is None else int(st[0])
            ids = _json.loads(st[1])
            seq = int(st[2])
        else:
            prior, ids, seq = None, [], 0
        old = verdicts(prior, ids)
        if installs:
            # the store holds ONE keeper per hash (min prior id) — take
            # min across duplicate installs for determinism
            prior = min(installs + ([prior] if prior is not None else []))
        ids2 = ids + docs
        new = verdicts(prior, ids2)
        seq += 1
        rows = [
            {"doc_id": d, "status": s, "keeper_id": k, "upd_seq": seq}
            for d, (s, k) in sorted(new.items())
            if old.get(d) != (s, k)
        ]
        # once the store entry is known every future doc of this hash is
        # decided instantly — residents need no further tracking (state
        # bounded after install, the line-dedup crossing discipline)
        gstate.update((prior, _json.dumps([] if prior is not None else ids2),
                       seq))
        if rows:
            yield _pd.DataFrame(rows)

    return handler


def streaming_incremental_dedup(events: DataFrame) -> DataFrame:
    """Streaming twin of ``dedup.incremental_dedup`` (r12): the keeper
    store as keyed state per text hash; arriving increment docs get
    their verdict immediately and RE-EMIT with a higher ``upd_seq``
    when later arrivals change it — a late store install flips
    new/dup_incr residents to dup_prior, a late smaller increment id
    steals 'new' (the batch keeper is min(id), not arrival order).
    Take the max-``upd_seq`` row per doc downstream; that final answer
    equals the batch operator under ANY cross-batch arrival order —
    pinned in tests/test_streaming.py.

    State per hash: the prior keeper + (until it is known) the resident
    increment ids; an install CLEARS the resident list, so long-lived
    state is one bigint per hash — the store itself, which IS the
    operator's honest working set."""
    return events.groupBy("th").applyInPandasWithState(
        _make_incr_dedup_handler(),
        outputStructType=INCR_DEDUP_OUTPUT_SCHEMA,
        stateStructType=INCR_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
