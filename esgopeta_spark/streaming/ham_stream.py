"""Streaming HAM merge: the reference's live-subscription core loop
(gun/scoped_fetch.go:112-217) as a keyed stateful operator.

Keyed by (soul, field) — the reference's storage key.  State holds the
current winner (value + state + tiebreak json).  Each micro-batch:

1. drop updates that lose to the held winner under the HAM total order
   ``(state, value_json)`` (OlderHistorical / SameKeep);
2. hold back updates whose state is ahead of the system clock
   (TooFutureDeferred, gun/storage.go:107-117) in a pending list; a
   processing-time timeout re-attempts them once the clock passes —
   the streaming analog of the reference's scheduled retry;
3. emit a row only when the winner changes (IsImmediateUpdate
   transitions), exactly the reference's emit-if-winning filter.

``applyInPandasWithState`` is the right primitive: Arrow-batched, state
store on executors (RocksDB at scale), parallel across the key hash —
no driver involvement per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)


_VALUE_FIELDS = [
    ("value_type", StringType()),
    ("value_number_raw", StringType()),
    ("value_number", DoubleType()),
    ("value_string", StringType()),
    ("value_bool", BooleanType()),
    ("value_relation", StringType()),
]

OUTPUT_SCHEMA = StructType(
    [StructField("soul", StringType(), False), StructField("field", StringType(), False)]
    + [StructField(n, t, True) for n, t in _VALUE_FIELDS]
    + [StructField("state", DoubleType(), False)]
)

# winner tuple + json-encoded pending futures list
STATE_SCHEMA = StructType(
    [StructField(n, t, True) for n, t in _VALUE_FIELDS]
    + [
        StructField("state", DoubleType(), True),
        StructField("value_json", StringType(), True),
        StructField("pending_json", StringType(), True),
    ]
)

_VALUE_COLS = [n for n, _ in _VALUE_FIELDS]


def _make_handler(timers_enabled: bool):
    """Build the per-key stateful handler as a CLOSURE.

    cloudpickle serializes closures by value — including the helper
    functions defined inside — so executors never import esgopeta_spark.
    (A module-level handler is pickled by reference and dies with
    ModuleNotFoundError whenever the worker's sys.path lacks the repo,
    e.g. a driver launched from another cwd.)
    """
    import json as _json
    import time as _time

    value_cols = list(_VALUE_COLS)

    def _vjson(row):
        # inlined copy of types.value_json_py (keep in sync; unit test
        # test_handler_vjson_matches_types pins the equivalence)
        vt = row["value_type"]
        if vt == "null":
            return "null"
        if vt == "number":
            raw = row.get("value_number_raw")
            return raw if raw is not None else _json.dumps(row.get("value_number"))
        if vt == "string":
            return _json.dumps(row.get("value_string"), ensure_ascii=False, separators=(",", ":"))
        if vt == "bool":
            return "true" if row.get("value_bool") else "false"
        return '{"#":' + _json.dumps(row.get("value_relation"), ensure_ascii=False) + "}"

    def handler(key, pdfs, gstate):
        soul, field = key
        if gstate.exists:
            st = gstate.get
            winner = dict(zip(value_cols + ["state", "value_json"], st[:8]))
            pending = _json.loads(st[8]) if st[8] else []
        else:
            winner = None
            pending = []

        now_ms = _time.time() * 1000.0

        incoming = []
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                incoming.append({c: rec.get(c) for c in value_cols + ["state"]})

        # re-attempt previously deferred futures whose time has come
        ready = [p for p in pending if p["state"] <= now_ms]
        pending = [p for p in pending if p["state"] > now_ms]

        emitted = None
        for rec in sorted(incoming + ready, key=lambda r: (r["state"], _vjson(r))):
            if rec["state"] > now_ms:  # TooFutureDeferred
                pending.append(rec)
                continue
            if winner is None or (rec["state"], _vjson(rec)) > (winner["state"], winner["value_json"]):
                winner = {**{c: rec.get(c) for c in value_cols}, "state": rec["state"], "value_json": _vjson(rec)}
                emitted = winner

        new_state = tuple(
            [winner.get(c) if winner else None for c in value_cols]
            + [
                winner["state"] if winner else None,
                winner["value_json"] if winner else None,
                _json.dumps(pending) if pending else None,
            ]
        )
        gstate.update(new_state)
        if pending and timers_enabled:
            # wake when the earliest future becomes applicable (+100ms like
            # the reference's retry slack, gun/storage.go:109)
            earliest = min(p["state"] for p in pending)
            gstate.setTimeoutDuration(max(int(earliest - now_ms) + 100, 100))

        if emitted is not None:
            import pandas as _pd

            yield _pd.DataFrame(
                [{"soul": soul, "field": field, **{c: emitted.get(c) for c in value_cols}, "state": emitted["state"]}]
            )

    return handler


def streaming_ham_merge(updates: DataFrame, deferral_timers: bool = False) -> DataFrame:
    """updates (UPDATE_SCHEMA or quad-shaped) -> stream of winning quads.

    Emits one row per (soul, field) per micro-batch in which the winner
    changed — the IsImmediateUpdate filter of the reference.

    ``deferral_timers``: with True, future-state updates are re-applied
    promptly via processing-time timers (the reference's scheduled retry)
    — use for continuously-running queries.  Note a timer-mode query
    schedules no-data micro-batches to fire timers, so it never "drains":
    drive it with a continuous trigger, not availableNow.  With False
    (default), deferred rows still sit in state and re-merge the next
    time their key is touched (and always at batch compaction via
    ham_apply_updates) — the right trade for drain-and-stop pipelines.
    """
    quad_cols = ["soul", "field", *_VALUE_COLS, "state"]
    return (
        updates.select(*quad_cols)
        .groupBy("soul", "field")
        .applyInPandasWithState(
            _make_handler(deferral_timers),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
            if deferral_timers
            else GroupStateTimeout.NoTimeout,
        )
    )
