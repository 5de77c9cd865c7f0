"""Per-attempt-gated entry prober for the flapping-host regime.

For each named REGISTRY entry: poll the cpu canary before EVERY attempt
(fire only inside a momentarily-clean window), keep only attempts whose
own ext-CPU meter reads clean (<= 0.5 ext cores avg), until N clean
attempts or the deadline.  Prints per-attempt lines and a final JSON of
{entry: [best_clean, [clean attempts...]]}.

Usage: python tools/gated_entry_probe.py entry [entry ...] [--n N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _HZ, _subtree_jiffies, _total_busy_jiffies, cpu_canary_ms  # noqa: E402
from esgopeta_spark.plans import REGISTRY  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PER_ENTRY_MAX_S = 600


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    spark = get_spark("esgopeta-gated-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR).write.mode(
        "overwrite").format("noop").save()
    out = {}
    for name in names:
        fn = REGISTRY[name].fn
        clean: list[float] = []
        deadline = time.monotonic() + PER_ENTRY_MAX_S
        warm = False
        while len(clean) < n and time.monotonic() < deadline:
            while cpu_canary_ms() > 2.5 and time.monotonic() < deadline:
                time.sleep(5)
            j0, s0 = _total_busy_jiffies(), _subtree_jiffies()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            ext = max(
                0, (_total_busy_jiffies() - j0) - (_subtree_jiffies() - s0)
            ) / _HZ
            ok = ext <= 0.5 * dt
            print(f"{name}: {dt:.3f}s ext={ext:.2f}"
                  f" {'KEEP' if ok and warm else 'warmup' if not warm else 'drop'}",
                  flush=True)
            if ok and warm:
                clean.append(round(dt, 3))
            warm = True
            spark.catalog.clearCache()
        out[name] = (min(clean) if clean else None, clean)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
