"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

The LAST stdout line is one COMPACT headline JSON, guaranteed under the
driver's 2000-char tail capture (r12, verdict #1: the r11 line outgrew
the capture when the per-query ext_core_s map was added, so the round's
official perf record was unparseable):
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>, "loadavg_1m": <float>,
   "cpu_canary_ms": <float>, "mem_bw_ms": <float>,
   "contaminated": <bool>, "start_gate_timeout": <bool>,
   "dirty_n": <int>, "repeats": <int>}
If even the compact form would exceed the budget the queries map moves
wholesale to the sidecar and the headline carries
"queries_in": "bench_detail.json" instead — the headline NEVER truncates
mid-JSON.  Full detail (per-query ext_core_s, midrun_retries,
dirty_queries, external_core_s, and the same queries map) is always
written to bench_detail.json beside this script.

A run does not START until the box is idle (loadavg-1m <= 0.6 AND
loadavg-5m <= 0.8 AND cpu canary <= 2.5 ms AND memory-bandwidth canary
<= 20 ms — measured-idle thresholds), polling up to 10 minutes; if the
box never settles the run proceeds but self-labels
"start_gate_timeout" (r7 VERDICT: the gate used to be a caption, and a
loaded-box recording manufactured a phantom 9% regression; r8: the
1m-only gate let a 5m/15m load tail inflate 12 queries ~1.2x; r13, r12
verdict #2: the matmul canary is blind to memory-bandwidth/steal
contention — identical code ran 15-20% slower at MATCHED canary — so a
100 MB streaming-memcpy probe joins the gate and the record).

r11 (verdict #2 — two consecutive recorded rounds self-labeled
contaminated under sustained neighbor noise): per-query BOUNDED
ACCEPTANCE.  Each query is timed in best-of-REPEATS rounds; an attempt
is CLEAN when it ran beside <= 0.5 external CPU cores (all-core busy
jiffies minus our own process subtree — steal time included, so host
neighbors count; the ext meter is the ONLY per-query judge — the canary
and loadavg cannot tell a neighbor from the bench's own thread tail).
A query with no clean attempt settles RETRY_SETTLE_S and re-times, up
to ACCEPT_ROUNDS total rounds ("midrun_retries" lists each
retry); the recorded time is the fastest CLEAN attempt (falling back to
the fastest overall only if no attempt ever came clean — those queries
are listed in "dirty_queries" and the run labels "contaminated").
"ext_core_s" records per query the external CPU beside the KEPT
attempt, so a reader can adjudicate any single number; "contaminated"
is now a per-query-evidence verdict, not a whole-run caption — a run
that starts on a busy box but lands every query beside an idle window
is recorded clean, which is exactly what the r10 drift adjudication
needed and could not have.

Results are materialized through the noop sink (full execution, no
driver-side collection cost) after a JVM warmup pass.

The loadavg field makes a contaminated run SELF-LABELING: round 3's
driver-recorded total was ~2x an idle-box re-run of the identical code
because concurrent external work landed on the box (adjudicated in
VERDICT r3).  A reader seeing loadavg_1m >> SPARK_GRAFT_CPUS at start
knows the numbers measure the box, not the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from esgopeta_spark.plans import REGISTRY
from esgopeta_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "win_topk_orders_per_customer",
    "agg_rollup_region_nation",
    "graph_ham_merge_events",
    "graph_traverse_customer_region",
    "stream_tumbling_counts",
    "stream_session_windows",
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    # (r14-opt: the r14-build "retirements" below were restored — the
    # bench contract is append-only; the line fits via 2-decimal
    # display precision in the headline map, 3-decimal in the sidecar)
    "text_profile_docs",
    "sim_topk_cosine",
    "sim_topk_cosine_lsh",
    # round-3 graded flagships: temporal join, graph analytics, skew ops.
    # (graph_ham_stream_replay is deliberately NOT here: it funnels every
    # row through the per-key Python streaming handler to prove
    # batch≡stream semantics — a correctness artifact; the throughput
    # path for the same merge is graph_ham_merge_events above.)
    "join_asof_purchase_click",
    "graph_pagerank_transactions",
    "graph_triangles_coorder",
    "skew_salted_join",
    # round-4 graded flagships: ANN scale tier + real PNG codec round-trip
    "sim_topk_cosine_ivf",
    "multimodal_decode_png",
    # round-5 flagships (all inside the graded window after the r5
    # rotations): SemDeDup, substring spans, PQ-ADC, LPA communities
    "dedup_semantic_kmeans",
    "dedup_substring_spans",
    "sim_topk_ip_pq",
    "graph_communities_lpa",
    # round-6 flagships: CMS heavy hitters, LOCF gap fill (r13: k-core
    # and the mp2 sibling retired from the roster to fund the r13
    # additions under the record budget — k-core has been parity-only
    # since r10 with pagerank/triangles/LPA still measured, and mp3
    # strictly supersedes the mp2 decode machinery; their historical
    # per-round numbers live in BENCH_r*.json)
    "agg_cms_heavy_hitters",
    "ts_gapfill_daily_locf",
    # round-8 flagships: REAL MPEG-1 Layer III round trip (Huffman + bit
    # reservoir + hybrid MDCT) and the image/audio near-dup rotations
    "multimodal_decode_mp3_audio",
    "dedup_image_dhash",
    "dedup_audio_fingerprint",
    # round-9 flagships: FLAC lossless round trip (exact-sum oracle),
    # DSIR importance selection, entropy/KL quality signals (both on the
    # engine-exact integer milli-log2)
    "multimodal_decode_flac",
    "select_dsir_scores",
    "text_entropy_kl_profile",
    # round-10 flagships: the crawl front-end (HTML->text extraction,
    # URL canonicalization + dedup, the fused crawl-to-writer pipeline)
    # and the newly-graded late-r9 families (keyed recursion, selection
    # terminal step)
    "text_html_extract",
    "web_url_canonical_dedup",
    # (r13: pipeline_html_to_shards retired from the roster — the
    # r10 crawl capstone below measures its superset lineage)
    "ts_ewma_daily",
    "select_mixture_materialize",
    # the r10 capstone: raw mixed WARC bytes -> HTTP unwrap -> sniff ->
    # extract -> gate -> split/shard rollup, one lineage
    "pipeline_crawl_to_shards",
    # late-r10: the trained-classifier curation stage (NB language-ID,
    # engine-exact integer-log train->score->argmax) and the crawl
    # DISCOVERY capstone (sitemap -> canonicalize -> robots -> politeness)
    "select_nb_langid",
    "pipeline_crawl_frontier",
    # round-11 flagships: bounded PDF extraction (the crawl loop's last
    # big ingest format) and HTTP redirect resolution + chain collapse
    # (pipeline_crawl_frontier above also gained the redirect stage)
    "text_pdf_extract",
    "web_redirect_resolve",
    # r11 third wave: the wire-encoding unwrap (gzip/deflate/chunked
    # through the full WARC->HTTP->charset chain) and the cross-page
    # host-template cut (all-codegen, two natural-key shuffles)
    "web_content_encoding",
    "web_template_lines",
    # r12 graded-window rotation: the fuzzy-decontamination class and the
    # nightly-update capstone (incremental dedup -> decontam gate -> split)
    "decontaminate_minhash_fuzzy",
    "pipeline_incremental_snapshot",
    # r13 graded-window rotation: the r12 capability classes' graded reps
    # (PDF font tables, per-family PassJoin, header robots gate, KMV
    # set-overlap sketch)
    "text_pdf_font_remap",
    "dedup_fuzzy_family_titles",
    "web_xrobots_gate",
    "sketch_kmv_overlap",
    # r13 waves: the modern Content-Encoding unwrap (zstd through the
    # from-scratch RFC 8878 decoder / pyarrow C path, brotli) and the
    # bitext miner's IVF scale tier (cell-equi candidates)
    "web_content_encoding_modern",
    "mine_bitext_margin_ivf",
    # r14 graded-window rotation: the remaining r13 capability classes'
    # graded reps (from-scratch zstd decode under libzstd input, unicode
    # fold, PDF stream filters, PSI snapshot-drift alarm)
    "web_zstd_house_decode",
    "text_unicode_fold",
    "text_pdf_filters",
    "corpus_drift_psi",
    # r14 waves (r15 rotation candidates, pre-named in COVERAGE.md):
    # the from-scratch zstd ENCODER under libzstd-decode authority and
    # the MPEG-1 VIDEO intra round trip with dHash scene cuts
    "web_zstd_house_encode",
    "multimodal_decode_mpeg1_video",
]


REPEATS = 3


def cpu_canary_ms() -> float:
    """Best-of-3 wall time of a fixed numpy matmul (BLAS-parallel, so it
    measures the box's effective parallel compute bandwidth — the same
    resource Spark's 32 local threads contend for).

    loadavg only sees THIS container's processes; host-level neighbors
    (CPU steal) are invisible to it — measured same-code runs differ 30%+
    while loadavg reads near zero.  A fixed pure-CPU workload exposes the
    machine's effective speed at bench time: compare canary values across
    BENCH_r{N}.json files before comparing query wall-times.  (Canary
    shifts also reflect BLAS thread-count env changes — the driver runs
    bench with a fixed environment, so cross-round comparison holds.)
    """
    import numpy as np

    a = np.ones((512, 512))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ a).sum()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 2)


def mem_bw_canary_ms() -> float:
    """Best-of-3 wall time of a 100 MB streaming memcpy (r13, r12
    verdict #2): the BLAS-matmul canary is compute-bound and BLIND to
    memory-bandwidth / steal contention — r12's host window ran
    identical code 15-20% slower at MATCHED matmul canary.  A large
    copy saturates the memory subsystem instead, so the two probes
    together separate the contention modes.  One warm pass first-touches
    the destination so page faults don't pollute the timing."""
    import numpy as np

    src = np.ones(100 * 1024 * 1024 // 8)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # warm: fault in dst pages outside the timing
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 2)


# Idle-box gate (r7 VERDICT: BENCH_r07 was recorded at loadavg 2.97 /
# canary 3.6 ms and manufactured a phantom 9% regression).  A timing run
# only starts once the box looks idle; after MAX_WAIT_S we proceed anyway
# (the driver must get a record) but self-label "contaminated": true.
#
# r9 (verdict #1/#5): BENCH_r08 passed the 1m-loadavg gate yet read ~1.2x
# an idle rerun — the 1m average had settled while the 5m/15m tail (2.4+)
# still bled into the early queries.  Two fixes: (a) the start gate now
# also requires loadavg-5m <= LOADAVG5_MAX, (b) the canary re-runs AFTER
# every query's timing; a busy canary invalidates that timing, waits for
# idle, and re-times the query once (recorded in "midrun_retries").
#
# Late r9: a run that started at loadavg 1.10/1.14 still passed the
# 1.5/1.5 gate and read inflated with 5 midrun retries; genuinely idle
# runs on this box sit at 0.03-0.6.  Thresholds tightened to what idle
# actually looks like — residual load now waits out (MAX_WAIT raised to
# compensate) instead of bleeding into the first query group.
CANARY_MAX_MS = 2.5
LOADAVG_MAX = 0.6
LOADAVG5_MAX = 0.8
# the measured idle norm for the start canary; the contamination label
# trips at CONTAM_DRIFT x this (r13: lowered from 2x — at 2x the clause
# was DEAD code, the 2.5 ms start gate could never admit a 3.0 ms canary)
CANARY_IDLE_NORM_MS = 1.5
# r13 (r12 verdict #2): idle norm + start gate for the memory-bandwidth
# probe — the contention mode the matmul canary can't see.  Norm measured
# on this box (best-of-3 of a 100 MB copy, repeated idle sessions).
MEMBW_IDLE_NORM_MS = 12.0
MEMBW_MAX_MS = 20.0
# either probe drifting past ~1.3x its idle norm labels the run
CONTAM_DRIFT = 1.3
# 2+ queries with NO clean attempt over ACCEPT_ROUNDS x REPEATS tries is
# sustained mid-run contention, not one unlucky stall (r12 ADVICE: a
# dirty_n=4 / 16 external core-s run self-labeled clean)
DIRTY_N_CONTAM = 2
# the driver's stdout tail capture is 2000 chars; the line prints last
# (spark already stopped), so line + newline <= 2000 is the hard cap.
# r14 optimization round: the roster is append-only (the driver contract
# forbids removing or renaming existing queries), so the r14-build
# "retirements" were restored; with 59 entries the map fits only at
# 2-decimal display precision (sidecar keeps 3) with the static
# "repeats" field moved to the sidecar; budget 1985 = 15 chars of
# margin under the capture (nothing prints after the line — spark is
# already stopped, r13's captured tail ends exactly at the JSON+\n;
# the shed-to-sidecar guard below still backstops a freak overrun).
HEADLINE_BUDGET_CHARS = 1985
MAX_WAIT_S = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "600"))
WAIT_STEP_S = 20
# r14 (r13 verdict #5): on gate timeout, retry the whole wait window a
# bounded number of extra times before publishing a gate-timeout record
# — the r13 host flapped 1.5 <-> 150 ms canary between 2-minute polls,
# so a single 10-minute horizon can miss a clean window that a second
# horizon catches.  The honest contaminated label still applies if NO
# window comes clean over the full bounded horizon.
GATE_RETRY_WINDOWS = int(os.environ.get("SPARK_GRAFT_BENCH_GATE_RETRIES", "2"))


def wait_for_idle_box(
    max_wait_s: int = MAX_WAIT_S,
    retry_windows: int = GATE_RETRY_WINDOWS,
    wait_step_s: float = WAIT_STEP_S,
) -> tuple[float, float, float, bool]:
    """Poll until loadavg-1m, loadavg-5m, the cpu canary AND the
    memory-bandwidth canary are under the gates (r13: the bandwidth
    probe joins the gate — r12's noise mode passed the matmul gate).
    The wait runs in 1 + ``retry_windows`` horizons of ``max_wait_s``
    each; only when EVERY horizon times out does the run proceed with
    the gate-timeout (contaminated) label.

    Returns (loadavg_1m, canary_ms, mem_bw_ms, contaminated) from the
    LAST poll — the values that actually preceded the timed run.
    """
    load = canary = mem_bw = float("inf")
    for window in range(retry_windows + 1):
        deadline = time.monotonic() + max_wait_s
        while True:
            load, load5 = os.getloadavg()[:2]
            canary = cpu_canary_ms()
            mem_bw = mem_bw_canary_ms()
            if (canary <= CANARY_MAX_MS and mem_bw <= MEMBW_MAX_MS
                    and load <= LOADAVG_MAX and load5 <= LOADAVG5_MAX):
                return load, canary, mem_bw, False
            if time.monotonic() >= deadline:
                break
            print(
                f"# bench: box busy (loadavg {load:.2f}/{load5:.2f}, "
                f"canary {canary:.2f} ms, membw {mem_bw:.2f} ms); waiting",
                file=sys.stderr,
            )
            time.sleep(wait_step_s)
        if window < retry_windows:
            print(
                f"# bench: gate window {window + 1}/{retry_windows + 1} "
                f"timed out; retrying the wait before accepting a "
                f"gate-timeout record",
                file=sys.stderr,
            )
    return load, canary, mem_bw, True


def _total_busy_jiffies() -> int:
    """Busy jiffies across all cores (/proc/stat cpu line, idle+iowait
    excluded)."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals) - vals[3] - vals[4]


def _subtree_jiffies() -> int:
    """utime+stime summed over THIS process and every descendant (the
    Spark JVM and its python workers are children) — one /proc walk."""
    me = os.getpid()
    children: dict[int, list[int]] = {}
    cpu: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                s = f.read()
        except OSError:
            continue
        rest = s[s.rindex(")") + 2:].split()
        pid = int(d)
        cpu[pid] = int(rest[11]) + int(rest[12])
        children.setdefault(int(rest[1]), []).append(pid)
    total = 0
    stack, seen = [me], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += cpu.get(p, 0)
        stack.extend(children.get(p, []))
    return total


# External-CPU contamination detector (late r9): the 1-thread canary
# catches a BUSY instant between queries but misses multi-core external
# work burning DURING a query on this 32-thread box (three runs read a
# uniform ~1.3x with clean canaries).  Around each timing attempt we
# diff total busy jiffies against our own process subtree's jiffies —
# the remainder is external CPU.  A query whose best attempt ran beside
# more than EXT_CORES_MAX cores of external work is re-timed once and
# the run self-labels via "external_core_s" either way.
EXT_CORES_MAX = 0.5
# r11 bounded acceptance: total best-of-REPEATS rounds a query may take
# to land a clean attempt before it is recorded dirty, and the fixed
# settle between rounds (NOT loadavg-gated — see the loop comment)
ACCEPT_ROUNDS = 3
RETRY_SETTLE_S = 15
# r14 (session 2): attempt-DISPERSION retry + label.  The host has a
# contention mode that is invisible to BOTH per-query judges: a
# neighbor VM saturating memory bandwidth / stealing cycles makes our
# own tasks run 4-20x longer while every core reads busy in OUR
# process subtree (ext = 0.0) and the start-gate canaries were clean
# minutes earlier (measured: dedup_image_dhash 18.4 s at ext 1.28 on a
# start-gated run whose idle-window norm is 1.4 s, with the box canary
# flapping 0.8 <-> 102 ms between polls that same hour).  Post-attempt
# canary probes CANNOT arbitrate this — our own executor tail pollutes
# them for seconds after a heavy query (measured 4.5-17 ms right after
# a clean-pre-probe query; the r11 deadlock lesson again).  What IS
# reliable is the spread of our own repeated attempts: the queries are
# deterministic and a clean box repeats them within a few percent, so
# a max/min ratio past UNSTABLE_SPREAD (with an absolute floor so
# 0.3-s queries' jitter doesn't trip it) is a neighbor signature.
# The statistic is CORROBORATION of the kept minimum, not raw spread:
# a single 45-s-class stall landing on one attempt must not damn a
# query whose other attempts agree (measured: the flapping host lands
# such outliers on 10-16 of 59 queries per run while every kept best
# repeats within a few percent) — what makes a kept number
# trustworthy is a second attempt within CORROB_RATIO (or
# CORROB_ABS_S for sub-second queries) of the best.  An uncorroborated
# best gets the same bounded extra rounds the ext meter triggers; if
# no corroborating attempt ever lands the query is listed in
# "unstable_queries" and 2+ such queries label the record contaminated
# (same threshold as dirty_n).  On an idle box every query is
# corroborated after round 1 and NOTHING changes.  The mode this
# cannot catch — ALL attempts uniformly inflated — is exactly the
# cross-run canary-ratio adjudication CLAUDE.md documents.
CORROB_RATIO = 1.25
CORROB_ABS_S = 0.25
_HZ = os.sysconf("SC_CLK_TCK")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    load_start, canary, mem_bw, start_gate_timeout = wait_for_idle_box()
    spark = get_spark("esgopeta-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup: a scan plus one representative aggregate query so
    # the first timed query doesn't pay JIT/codegen bring-up
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    def timing_round(fn) -> list[tuple[float, float]]:
        # best-of-REPEATS per round: the box hosts periodic external work
        # whose ~45s stalls otherwise land on whichever query is running
        # (measured: outliers move between queries across runs while
        # warm-path times are stable).  Returns every (wall seconds,
        # external core-seconds DURING that attempt) pair.
        out: list[tuple[float, float]] = []
        for _ in range(REPEATS):
            j0, s0 = _total_busy_jiffies(), _subtree_jiffies()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            ext = max(0, (_total_busy_jiffies() - j0) - (_subtree_jiffies() - s0)) / _HZ
            out.append((dt, ext))
            # release intra-query persists so one query's cache doesn't skew the next
            spark.catalog.clearCache()
        return out

    timings: dict[str, float] = {}
    ext_map: dict[str, float] = {}
    midrun_retries: list[str] = []
    dirty_queries: list[str] = []
    external_core_s = 0.0
    unstable_queries: list[str] = []

    def _unstable(pool: list[tuple[float, float]]) -> bool:
        # neighbor signature: the kept minimum has NO corroborating
        # second attempt (within CORROB_RATIO or CORROB_ABS_S of it)
        dts = sorted(a[0] for a in pool)
        if len(dts) < 2:
            return True
        return dts[1] - dts[0] > CORROB_ABS_S and dts[1] / dts[0] > CORROB_RATIO

    for name in HEADLINE:
        fn = REGISTRY[name].fn
        attempts: list[tuple[float, float]] = []
        clean: list[tuple[float, float]] = []
        for rnd in range(ACCEPT_ROUNDS):
            attempts += timing_round(fn)
            # clean = ran beside <= EXT_CORES_MAX external cores.  The
            # ext meter (all-core busy jiffies minus OUR process
            # subtree) is the only per-query judge of EXTERNAL-PROCESS
            # contention: the canary and the loadavg gates cannot
            # distinguish a neighbor from the bench's own 32-thread
            # tail, so using them here deadlocks the retry path against
            # our own decaying load (r11-hit: a 5-minute bench ran 40+
            # minutes of self-inflicted idle-waits).  The canary stays
            # in the START gate, where nothing of ours has run yet.
            # Host-level steal/bandwidth neighbors are invisible to the
            # ext meter too — the attempt-DISPERSION test (see
            # UNSTABLE_SPREAD) arbitrates those from our own repeats.
            clean = [a for a in attempts if a[1] <= EXT_CORES_MAX * a[0]]
            if clean and not _unstable(clean):
                break
            if rnd + 1 < ACCEPT_ROUNDS:
                b = min(attempts, key=lambda a: a[0])
                why = (
                    f"uncorroborated best {b[0]:.2f} s (next "
                    f"{sorted(a[0] for a in attempts)[1]:.2f} s)" if clean else
                    f"no clean attempt (best ext {b[1]:.2f} core-s / {b[0]:.2f} s)"
                )
                print(
                    f"# bench: {why} for {name}; "
                    f"settling {RETRY_SETTLE_S}s and re-timing",
                    file=sys.stderr,
                )
                midrun_retries.append(name)
                time.sleep(RETRY_SETTLE_S)
        pool = clean or attempts
        if not clean:
            dirty_queries.append(name)
        if _unstable(pool):
            unstable_queries.append(name)
        best, ext = min(pool, key=lambda a: a[0])
        timings[name] = round(best, 3)
        ext_map[name] = round(ext, 2)
        external_core_s += ext

    line, detail = build_records(
        timings, ext_map, midrun_retries, dirty_queries, external_core_s,
        sf, load_start, canary, mem_bw, start_gate_timeout,
        unstable_queries,
    )
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(sidecar, "w") as f:
        json.dump(detail, f, indent=1)
    print(line)
    spark.stop()


def build_records(
    timings: dict,
    ext_map: dict,
    midrun_retries: list,
    dirty_queries: list,
    external_core_s: float,
    sf: float,
    load_start: float,
    canary: float,
    mem_bw: float,
    start_gate_timeout: bool,
    unstable_queries: list | None = None,
) -> tuple[str, dict]:
    """(compact headline line, full sidecar detail).  The headline is
    GUARANTEED under HEADLINE_BUDGET_CHARS — the queries map sheds to
    the sidecar rather than the line truncating mid-JSON.  The
    contamination verdict (r13, r12 verdict #2 + ADVICE; r14 session 2
    adds the dispersion clause): gate timeout, EITHER canary drifting
    past ~1.3x its idle norm (the old 2x trip was dead code — the
    2.5 ms start gate could never admit 3.0 ms), sustained mid-run
    contention (2+ dirty queries — r12's dirty_n=4 / 16 external
    core-s run self-labeled clean), OR 2+ queries whose attempts never
    stabilized (the steal/bandwidth neighbor mode both other judges
    are blind to — see UNSTABLE_SPREAD).  Unit-pinned in
    tests/test_bench_record.py."""
    unstable_queries = unstable_queries or []
    total = round(sum(timings.values()), 3)
    contaminated = (
        start_gate_timeout
        or canary > CONTAM_DRIFT * CANARY_IDLE_NORM_MS
        or mem_bw > CONTAM_DRIFT * MEMBW_IDLE_NORM_MS
        or len(dirty_queries) >= DIRTY_N_CONTAM
        or len(unstable_queries) >= DIRTY_N_CONTAM
    )
    headline = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        # 2-decimal display precision keeps the 59-entry roster inside
        # the driver's tail capture; the sidecar keeps 3 decimals
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
        "loadavg_1m": round(load_start, 2),
        "cpu_canary_ms": canary,
        "mem_bw_ms": mem_bw,
        "contaminated": contaminated,
        "start_gate_timeout": start_gate_timeout,
        "dirty_n": len(dirty_queries),
        "unstable_n": len(unstable_queries),
    }
    detail = dict(
        headline,
        queries=timings,
        repeats=REPEATS,
        unstable_queries=unstable_queries,
        ext_core_s=ext_map,
        midrun_retries=midrun_retries,
        dirty_queries=dirty_queries,
        external_core_s=round(external_core_s, 2),
    )
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) > HEADLINE_BUDGET_CHARS:
        headline.pop("queries")
        headline["queries_in"] = "bench_detail.json"
        line = json.dumps(headline, separators=(",", ":"))
    return line, detail


if __name__ == "__main__":
    main()
