"""Pin the driver-facing bench record (r12, verdict #1): the FINAL
stdout line must stay under the driver's 2000-char tail capture and
never truncate mid-JSON.  Round 11's record was unparseable because the
line silently outgrew the capture — this module fails BEFORE that can
recur (e.g. when HEADLINE grows past the budget).

r13 contamination policy (r12 verdict #2 + ADVICE): the label trips on
start-gate timeout, EITHER canary (matmul compute / 100 MB streaming
memcpy bandwidth) drifting past ~1.3x its idle norm, or 2+ dirty
queries (sustained mid-run contention).  The old 2x-canary trip was
dead code — the 2.5 ms start gate could never admit a 3.0 ms canary.
"""

from __future__ import annotations

import json

import bench


def _records(n_queries, canary=1.5, mem_bw=12.0, gate_timeout=False,
             dirty=(), unstable=()):
    timings = {f"some_quite_long_query_name_{i:03d}": 12.345
               for i in range(n_queries)}
    ext = {k: 0.12 for k in timings}
    return bench.build_records(
        timings, ext, [], list(dirty), 1.23, 0.1, 0.05, canary, mem_bw,
        gate_timeout, list(unstable),
    )


def test_headline_for_current_roster_fits_and_parses():
    # the REAL roster names: this is the check that fails when a new
    # headliner pushes the line past the capture budget
    timings = {k: 12.345 for k in bench.HEADLINE}
    ext = {k: 0.12 for k in timings}
    line, detail = bench.build_records(
        timings, ext, [], [], 1.23, 0.1, 0.05, 1.5, 12.0, False)
    assert len(line) <= bench.HEADLINE_BUDGET_CHARS, len(line)
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total" and "queries" in d, (
        "the real roster must fit WITH its queries map — trim HEADLINE "
        "or raise the budget")
    assert d["mem_bw_ms"] == 12.0  # the bandwidth probe reaches the record
    assert set(detail) >= {"ext_core_s", "dirty_queries", "external_core_s"}


def test_oversized_roster_sheds_queries_never_truncates():
    line, detail = _records(200)  # far past any realistic roster
    assert len(line) <= bench.HEADLINE_BUDGET_CHARS
    d = json.loads(line)  # still one valid JSON object
    assert "queries" not in d and d["queries_in"] == "bench_detail.json"
    assert len(detail["queries"]) == 200  # nothing lost: sidecar keeps all


def test_contamination_label_policy():
    # clean gate, both canaries at norm, one unlucky dirty query -> clean
    d = json.loads(_records(5, dirty=["a"])[0])
    assert d["contaminated"] is False and d["dirty_n"] == 1
    # 2+ dirty queries = sustained mid-run contention (r12 ADVICE: a
    # dirty_n=4 run self-labeled clean) -> trips
    assert json.loads(_records(5, dirty=["a", "b"])[0])["contaminated"] is True
    # the canary clause must be LIVE below the 2.5 ms start gate (the
    # old 2x trip at 3.0 ms was unreachable)
    assert bench.CONTAM_DRIFT * bench.CANARY_IDLE_NORM_MS < bench.CANARY_MAX_MS
    assert json.loads(_records(5, canary=2.2)[0])["contaminated"] is True
    assert json.loads(_records(5, canary=1.9)[0])["contaminated"] is False
    # the bandwidth clause must be LIVE below its start gate too
    assert bench.CONTAM_DRIFT * bench.MEMBW_IDLE_NORM_MS < bench.MEMBW_MAX_MS
    assert json.loads(_records(5, mem_bw=17.0)[0])["contaminated"] is True
    assert json.loads(_records(5, mem_bw=14.0)[0])["contaminated"] is False
    # gate timeout always trips
    assert json.loads(_records(5, gate_timeout=True)[0])["contaminated"] is True
    # r14 session 2: the attempt-dispersion clause — 2+ queries whose
    # attempts never stabilized (the steal/bandwidth neighbor mode the
    # ext meter reads as 0.0) trip the label; one unlucky query doesn't
    d = json.loads(_records(5, unstable=["a"])[0])
    assert d["contaminated"] is False and d["unstable_n"] == 1
    assert json.loads(_records(5, unstable=["a", "b"])[0])["contaminated"] is True


def test_unstable_corroboration_detector():
    """The dispersion statistic: the kept minimum must be CORROBORATED
    by a second attempt within CORROB_RATIO (or CORROB_ABS_S for
    sub-second queries) — one stall outlier among agreeing attempts
    does not damn a query, an uncorroborated minimum does."""
    u = bench  # attempts are (wall_s, ext_core_s) pairs

    def unstable(pool):  # replicate main()'s helper contract
        dts = sorted(a[0] for a in pool)
        if len(dts) < 2:
            return True
        return dts[1] - dts[0] > u.CORROB_ABS_S and dts[1] / dts[0] > u.CORROB_RATIO

    assert u.CORROB_RATIO == 1.25 and u.CORROB_ABS_S == 0.25
    assert unstable([(1.4, 0.0), (18.4, 0.0), (9.2, 0.0)])   # nothing agrees
    assert not unstable([(1.27, 0.0), (10.92, 0.0), (1.31, 0.0)])  # outlier amid repeats
    assert not unstable([(0.30, 0.0), (0.52, 0.0)])          # fast-query jitter (abs band)
    assert not unstable([(5.0, 0.0), (5.4, 0.0)])            # clean heavy repeat
    assert unstable([(5.0, 0.0), (7.9, 0.0)])                # 1.6x apart, no agreement


def test_gate_retry_windows_semantics(monkeypatch):
    """r14 (r13 verdict #5): a gate timeout must retry the whole wait
    window a bounded number of times before publishing a gate-timeout
    record — the r13 host flapped clean<->busy between polls — and a
    window that comes clean mid-retry returns contaminated=False."""
    calls = {"n": 0}

    def busy_then_idle(threshold):
        def probe():
            calls["n"] += 1
            return 100.0 if calls["n"] <= threshold else 1.0
        return probe

    monkeypatch.setattr(bench, "cpu_canary_ms", busy_then_idle(2))
    monkeypatch.setattr(bench, "mem_bw_canary_ms", lambda: 1.0)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.0, 0.0, 0.0))
    # window 1 times out busy (max_wait_s=0 -> single poll per window);
    # window 2's poll reads idle -> clean verdict, no timeout label
    load, canary, mem_bw, contaminated = bench.wait_for_idle_box(
        max_wait_s=0, retry_windows=2, wait_step_s=0)
    assert contaminated is False and canary == 1.0
    assert calls["n"] >= 3  # the retry really re-polled
    # every window busy -> honest gate-timeout label survives
    calls["n"] = 0
    monkeypatch.setattr(bench, "cpu_canary_ms", busy_then_idle(10**9))
    load, canary, mem_bw, contaminated = bench.wait_for_idle_box(
        max_wait_s=0, retry_windows=2, wait_step_s=0)
    assert contaminated is True
    assert calls["n"] == 3  # bounded: 1 + retry_windows polls, no spin
