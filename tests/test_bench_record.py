"""Pin the driver-facing bench record (r12, verdict #1): the FINAL
stdout line must stay under the driver's 2000-char tail capture and
never truncate mid-JSON, and the contamination label must key on the
start-gate evidence (canary drift / gate timeout), not solely on
per-query external CPU.  Round 11's record was unparseable because the
line silently outgrew the capture — this module fails BEFORE that can
recur (e.g. when HEADLINE grows past the budget)."""

from __future__ import annotations

import json

import bench


def _records(n_queries, canary=1.5, gate_timeout=False, dirty=()):
    timings = {f"some_quite_long_query_name_{i:03d}": 12.345
               for i in range(n_queries)}
    ext = {k: 0.12 for k in timings}
    return bench.build_records(
        timings, ext, [], list(dirty), 1.23, 0.1, 0.05, canary, gate_timeout,
    )


def test_headline_for_current_roster_fits_and_parses():
    # the REAL roster names: this is the check that fails when a new
    # headliner pushes the line past the capture budget
    timings = {k: 12.345 for k in bench.HEADLINE}
    ext = {k: 0.12 for k in timings}
    line, detail = bench.build_records(
        timings, ext, [], [], 1.23, 0.1, 0.05, 1.5, False)
    assert len(line) <= bench.HEADLINE_BUDGET_CHARS, len(line)
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total" and "queries" in d, (
        "the real roster must fit WITH its queries map — trim HEADLINE "
        "or raise the budget")
    assert set(detail) >= {"ext_core_s", "dirty_queries", "external_core_s"}


def test_oversized_roster_sheds_queries_never_truncates():
    line, detail = _records(200)  # far past any realistic roster
    assert len(line) <= bench.HEADLINE_BUDGET_CHARS
    d = json.loads(line)  # still one valid JSON object
    assert "queries" not in d and d["queries_in"] == "bench_detail.json"
    assert len(detail["queries"]) == 200  # nothing lost: sidecar keeps all


def test_contamination_label_keys_on_start_gate():
    # clean gate, clean canary, even WITH dirty queries -> annotate only
    line, _ = _records(5, canary=1.6, dirty=["a", "b"])
    d = json.loads(line)
    assert d["contaminated"] is False and d["dirty_n"] == 2
    # canary drift past 2x the idle norm trips it (the r11 driver run
    # read 50.9 ms and labeled clean — the bug this fixes)
    assert json.loads(_records(5, canary=3.1)[0])["contaminated"] is True
    assert json.loads(_records(5, gate_timeout=True)[0])["contaminated"] is True
    assert json.loads(_records(5, canary=2.9)[0])["contaminated"] is False
