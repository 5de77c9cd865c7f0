"""Stateful streaming anomaly detection — the stream twin of
``operators/timeseries.rolling_zscore`` (r6), and the second custom
stateful operator beside the HAM merge handler (F5 shape:
``applyInPandasWithState`` with explicit per-key state).

Per user the state is the accumulated day -> exact-cent-total map (plus
an update sequence counter); each micro-batch folds the new events in,
recomputes the trailing-window z-scores with the IDENTICAL float op
sequence as the batch operator, and emits every (user, day) row whose
(total, z) changed — update-mode semantics, so the sink is an upsert
store keyed (user, day) in production and the LAST emission per key is
the current truth (``upd_seq`` orders emissions for sinks that only
append; batch ≡ stream over a drained query is pinned in
tests/test_streaming.py).

Order-insensitive by construction (the state map is a fold of per-day
sums, and z recomputes from the map), so late/out-of-order events
converge to the batch answer without watermark coupling — the same
convergence argument as the HAM handler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("day_cents_json", StringType()),
        StructField("upd_seq", LongType()),
    ]
)

OUTPUT_SCHEMA = (
    "user_id bigint, day date, total_cents bigint, n_base bigint, "
    "z_micro bigint, is_anomaly int, upd_seq bigint"
)


def _make_handler(window_days: int, z_threshold_micro: int):
    """Per-key handler as a closure (cloudpickle-by-value — see
    ham_stream._make_handler for why module-level handlers break)."""
    import json as _json
    import math as _math
    from decimal import ROUND_HALF_UP as _RHU
    from decimal import Decimal as _Dec

    def _series(day_cents):
        """Recompute the full rolling series from the day->cents map with
        the SAME IEEE op sequence as timeseries.rolling_zscore."""
        days = sorted(day_cents)
        out = []
        for i, d in enumerate(days):
            lo = max(0, i - (window_days - 1))
            base = [day_cents[x] for x in days[lo : i + 1]]
            n = len(base)
            s1 = sum(base)
            s2 = sum(c * c for c in base)
            mean = float(s1) / float(n)
            var = float(s2) / float(n) - mean * mean
            if n >= 4 and var > 0:
                z = (float(day_cents[d]) - mean) / _math.sqrt(var)
                z_micro = int(_math.floor(z * 1000000.0 + 0.5))
            else:
                z_micro = None
            flag = 1 if z_micro is not None and abs(z_micro) >= z_threshold_micro else 0
            out.append((d, day_cents[d], n, z_micro, flag))
        return out

    def handler(key, pdfs, gstate):
        (user,) = key
        if gstate.exists:
            st = gstate.get
            day_cents = {k: int(v) for k, v in _json.loads(st[0]).items()}
            seq = int(st[1])
        else:
            day_cents, seq = {}, 0
        prev = {r[0]: r for r in _series(day_cents)} if day_cents else {}

        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                v = rec["value"]
                if v is None or (isinstance(v, float) and v != v):
                    continue  # null/NaN: no signal — matches the batch filter
                d = rec["ts"].floor("D").date().isoformat()
                # EXACTLY the batch cast: decimal(12,2) HALF_UP on the
                # double's shortest decimal repr (0.285 -> 29 cents, where
                # floor(v*100+0.5) would give 28)
                cents = int(_Dec(repr(float(v))).quantize(_Dec("0.01"), _RHU) * 100)
                day_cents[d] = day_cents.get(d, 0) + cents

        seq += 1
        gstate.update((_json.dumps(day_cents, sort_keys=True), seq))

        changed = [r for r in _series(day_cents) if prev.get(r[0]) != r]
        if changed:
            import datetime as _dt

            import pandas as _pd

            yield _pd.DataFrame(
                [
                    {
                        "user_id": user,
                        "day": _dt.date.fromisoformat(d),
                        "total_cents": total,
                        "n_base": n,
                        "z_micro": z,
                        "is_anomaly": flag,
                        "upd_seq": seq,
                    }
                    for d, total, n, z, flag in changed
                ]
            )

    return handler


def streaming_zscore(
    events: DataFrame,
    window_days: int = 7,
    z_threshold_micro: int = 2_000_000,
) -> DataFrame:
    """events (ts, user_id, value, ...) -> update-mode stream of per-day
    rolling z-score rows (see module docstring)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_handler(window_days, z_threshold_micro),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


LOCF_STATE_SCHEMA = StructType(
    [
        StructField("day_state_json", StringType()),
        StructField("upd_seq", LongType()),
    ]
)

LOCF_OUTPUT_SCHEMA = (
    "user_id bigint, bucket date, filled_value double, n_events bigint, "
    "is_gap int, upd_seq bigint"
)


def _make_locf_handler():
    """Per-key LOCF handler (closure, cloudpickle-by-value).  State per
    user: day -> [ts_nanos, tiebreak, value, n_events] keeping the day's
    LAST event under the (ts, tiebreak) total order — the same closing
    value rule as batch ``resample_locf`` — plus the event count."""
    import json as _json

    def _series(st):
        import datetime as _dt

        days = sorted(st)
        if not days:
            return []
        d0 = _dt.date.fromisoformat(days[0])
        d1 = _dt.date.fromisoformat(days[-1])
        out = []
        last = None
        d = d0
        while d <= d1:
            k = d.isoformat()
            if k in st:
                v = st[k][2]
                if v is not None:  # batch = last(ignorenulls): a null
                    last = v       # closing value carries the previous fill
                out.append((k, last, int(st[k][3]), 0))
            else:
                out.append((k, last, 0, 1))
            d += _dt.timedelta(days=1)
        return out

    def handler(key, pdfs, gstate):
        (user,) = key
        if gstate.exists:
            raw = gstate.get
            st = _json.loads(raw[0])
            seq = int(raw[1])
        else:
            st, seq = {}, 0
        prev = {r[0]: r for r in _series(st)}

        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                ts = rec["ts"]
                d = ts.floor("D").date().isoformat()
                cand = [int(ts.value), int(rec["event_id"]), rec["value"]]
                cur = st.get(d)
                if cur is None:
                    st[d] = cand + [1]
                else:
                    if (cand[0], cand[1]) > (cur[0], cur[1]):
                        st[d] = cand + [cur[3] + 1]
                    else:
                        cur[3] += 1

        seq += 1
        gstate.update((_json.dumps(st, sort_keys=True), seq))

        changed = [r for r in _series(st) if prev.get(r[0]) != r]
        if changed:
            import datetime as _dt

            import pandas as _pd

            yield _pd.DataFrame(
                [
                    {
                        "user_id": user,
                        "bucket": _dt.date.fromisoformat(d),
                        "filled_value": v,
                        "n_events": n,
                        "is_gap": g,
                        "upd_seq": seq,
                    }
                    for d, v, n, g in changed
                ]
            )

    return handler


def streaming_locf(events: DataFrame) -> DataFrame:
    """Streaming twin of ``operators/timeseries.resample_locf``: per-user
    daily grid with last-observation-carried-forward fill, maintained
    incrementally — late events retro-correct both the closing values
    and the grid span (the fold keeps the per-day (ts, event_id)-max
    event, so arrival order never matters).  Update-mode emissions keyed
    (user, bucket); ``upd_seq`` orders them for append-only sinks."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_locf_handler(),
            outputStructType=LOCF_OUTPUT_SCHEMA,
            stateStructType=LOCF_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_STATE_SCHEMA = StructType(
    [
        StructField("day_cents_json", StringType()),
        StructField("upd_seq", LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = (
    "user_id bigint, day date, total_cents bigint, ewma_cents bigint, "
    "dev_cents bigint, upd_seq bigint"
)


def _make_ewma_handler(alpha_milli: int):
    """Per-key EWMA handler (closure, cloudpickle-by-value).  State per
    user: the day -> exact-cent-total map; each batch folds new events
    in and recomputes the integer recursion over the full series
    (s_t = (alpha·x_t + (1000−alpha)·s_{t−1}) floordiv 1000 — identical
    to batch ``timeseries.ewma_smooth``), so late/out-of-order arrivals
    retro-correct every downstream smoothed value and the stream
    converges to the batch answer under ANY arrival order."""
    import json as _json
    from decimal import ROUND_HALF_UP as _RHU
    from decimal import Decimal as _Dec

    alpha = int(alpha_milli)
    beta = 1000 - alpha

    def _series(day_cents):
        days = sorted(day_cents)
        out = []
        s = None
        for d in days:
            x = day_cents[d]
            s = x if s is None else (alpha * x + beta * s) // 1000
            out.append((d, x, s, x - s))
        return out

    def handler(key, pdfs, gstate):
        (user,) = key
        if gstate.exists:
            st = gstate.get
            day_cents = {k: int(v) for k, v in _json.loads(st[0]).items()}
            seq = int(st[1])
        else:
            day_cents, seq = {}, 0
        prev = {r[0]: r for r in _series(day_cents)} if day_cents else {}

        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                v = rec["value"]
                if v is None or (isinstance(v, float) and v != v):
                    continue  # null/NaN: matches the batch filter
                d = rec["ts"].floor("D").date().isoformat()
                cents = int(_Dec(repr(float(v))).quantize(_Dec("0.01"), _RHU) * 100)
                day_cents[d] = day_cents.get(d, 0) + cents

        seq += 1
        gstate.update((_json.dumps(day_cents, sort_keys=True), seq))

        changed = [r for r in _series(day_cents) if prev.get(r[0]) != r]
        if changed:
            import datetime as _dt

            import pandas as _pd

            yield _pd.DataFrame(
                [
                    {
                        "user_id": user,
                        "day": _dt.date.fromisoformat(d),
                        "total_cents": x,
                        "ewma_cents": s,
                        "dev_cents": dev,
                        "upd_seq": seq,
                    }
                    for d, x, s, dev in changed
                ]
            )

    return handler


def streaming_ewma(events: DataFrame, alpha_milli: int = 300) -> DataFrame:
    """Streaming twin of ``operators/timeseries.ewma_smooth``: per-user
    daily EWMA maintained incrementally; a late day re-smooths the whole
    suffix (the recursion depends on every prior day), which is exactly
    what the changed-row re-emissions carry.  Update-mode keyed
    (user, day); ``upd_seq`` orders emissions for append-only sinks."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_ewma_handler(alpha_milli),
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUTPUT_SCHEMA = (
    "user_id bigint, day date, total_cents bigint, level_cents bigint, "
    "trend_cents bigint, forecast_next_cents bigint, upd_seq bigint"
)


def _make_holt_handler(alpha_milli: int, beta_milli: int):
    """Per-key Holt handler — same convergent day->cents state as the
    EWMA handler, recomputing the coupled level/trend recursion over the
    full series each batch (floor division, identical to batch
    ``timeseries.holt_trend``)."""
    import json as _json
    from decimal import ROUND_HALF_UP as _RHU
    from decimal import Decimal as _Dec

    a = int(alpha_milli)
    b_ = int(beta_milli)

    def _series(day_cents):
        days = sorted(day_cents)
        out = []
        lev = tr = None
        for d in days:
            x = day_cents[d]
            if lev is None:
                lev, tr = x, 0
            else:
                prev = lev
                lev = (a * x + (1000 - a) * (lev + tr)) // 1000
                tr = (b_ * (lev - prev) + (1000 - b_) * tr) // 1000
            out.append((d, x, lev, tr, lev + tr))
        return out

    def handler(key, pdfs, gstate):
        (user,) = key
        if gstate.exists:
            st = gstate.get
            day_cents = {k: int(v) for k, v in _json.loads(st[0]).items()}
            seq = int(st[1])
        else:
            day_cents, seq = {}, 0
        prev = {r[0]: r for r in _series(day_cents)} if day_cents else {}

        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                v = rec["value"]
                if v is None or (isinstance(v, float) and v != v):
                    continue
                d = rec["ts"].floor("D").date().isoformat()
                cents = int(_Dec(repr(float(v))).quantize(_Dec("0.01"), _RHU) * 100)
                day_cents[d] = day_cents.get(d, 0) + cents

        seq += 1
        gstate.update((_json.dumps(day_cents, sort_keys=True), seq))

        changed = [r for r in _series(day_cents) if prev.get(r[0]) != r]
        if changed:
            import datetime as _dt

            import pandas as _pd

            yield _pd.DataFrame(
                [
                    {
                        "user_id": user,
                        "day": _dt.date.fromisoformat(d),
                        "total_cents": x,
                        "level_cents": lv,
                        "trend_cents": t,
                        "forecast_next_cents": fc,
                        "upd_seq": seq,
                    }
                    for d, x, lv, t, fc in changed
                ]
            )

    return handler


def streaming_holt(
    events: DataFrame, alpha_milli: int = 300, beta_milli: int = 100
) -> DataFrame:
    """Streaming twin of ``operators/timeseries.holt_trend`` — the EWMA
    twin's convergence argument verbatim (late days re-smooth the
    suffix); update-mode keyed (user, day)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_holt_handler(alpha_milli, beta_milli),
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_WINTERS_OUTPUT_SCHEMA = (
    "user_id bigint, day date, total_cents bigint, level_cents bigint, "
    "trend_cents bigint, seasonal_cents bigint, forecast_next_cents bigint, "
    "upd_seq bigint"
)


def _make_holt_winters_handler(alpha_milli: int, beta_milli: int,
                               gamma_milli: int, period: int):
    """Per-key Holt-Winters handler — the Holt handler's convergent
    day->cents state, recomputing the level/trend/seasonal recursion
    over the full series each batch (calendar-phase seasonal slots,
    floor division — identical to batch ``timeseries.holt_winters``)."""
    import datetime as _dt
    import json as _json
    from decimal import ROUND_HALF_UP as _RHU
    from decimal import Decimal as _Dec

    a = int(alpha_milli)
    b_ = int(beta_milli)
    g = int(gamma_milli)
    m = int(period)
    epoch = _dt.date(1970, 1, 1)

    def _fd(n):
        return (n - ((n % 1000 + 1000) % 1000)) // 1000

    def _series(day_cents):
        days = sorted(day_cents)
        out = []
        lev, tr, s = None, 0, [0] * m
        for d in days:
            x = day_cents[d]
            p = (_dt.date.fromisoformat(d) - epoch).days % m
            if lev is None:
                lev, tr = x, 0
                s[p] = 0
            else:
                prev = lev
                lev = _fd(a * (x - s[p]) + (1000 - a) * (lev + tr))
                tr = _fd(b_ * (lev - prev) + (1000 - b_) * tr)
                s[p] = _fd(g * (x - lev) + (1000 - g) * s[p])
            out.append((d, x, lev, tr, s[p], lev + tr + s[(p + 1) % m]))
        return out

    def handler(key, pdfs, gstate):
        (user,) = key
        if gstate.exists:
            st = gstate.get
            day_cents = {k: int(v) for k, v in _json.loads(st[0]).items()}
            seq = int(st[1])
        else:
            day_cents, seq = {}, 0
        prev = {r[0]: r for r in _series(day_cents)} if day_cents else {}

        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                v = rec["value"]
                if v is None or (isinstance(v, float) and v != v):
                    continue
                d = rec["ts"].floor("D").date().isoformat()
                cents = int(_Dec(repr(float(v))).quantize(_Dec("0.01"), _RHU) * 100)
                day_cents[d] = day_cents.get(d, 0) + cents

        seq += 1
        gstate.update((_json.dumps(day_cents, sort_keys=True), seq))

        changed = [r for r in _series(day_cents) if prev.get(r[0]) != r]
        if changed:
            import pandas as _pd

            yield _pd.DataFrame(
                [
                    {
                        "user_id": user,
                        "day": _dt.date.fromisoformat(d),
                        "total_cents": x,
                        "level_cents": lv,
                        "trend_cents": t,
                        "seasonal_cents": sc,
                        "forecast_next_cents": fc,
                        "upd_seq": seq,
                    }
                    for d, x, lv, t, sc, fc in changed
                ]
            )

    return handler


def streaming_holt_winters(
    events: DataFrame,
    alpha_milli: int = 300,
    beta_milli: int = 100,
    gamma_milli: int = 200,
    period: int = 7,
) -> DataFrame:
    """Streaming twin of ``operators/timeseries.holt_winters`` — the
    Holt twin's convergence argument verbatim (a late day re-smooths
    the suffix INCLUDING downstream seasonal slots, since the recursion
    replays the full day->cents state); update-mode keyed (user, day)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_holt_winters_handler(alpha_milli, beta_milli,
                                       gamma_milli, period),
            outputStructType=HOLT_WINTERS_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
