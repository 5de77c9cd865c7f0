"""Generic per-entry timing probe for the r14 optimization round.

Times REGISTRY entries (construction + noop materialization, the
bench's timing shape) best-of-N with the bench's external-CPU meter, so
each number carries its own contamination evidence.  No idle gate —
intended for quick interleaved A/B probes on a box the operator has
already checked with ``uptime``; the authoritative numbers stay
bench.py's.

Usage: python tools/ab_probe_r14.py entry [entry ...] [--n N]
Prints one line per attempt and a best-of summary per entry.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _subtree_jiffies, _total_busy_jiffies, _HZ  # noqa: E402
from esgopeta_spark.plans import REGISTRY  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("esgopeta-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # warm codegen/JIT on a representative aggregate
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.mode(
        "overwrite").format("noop").save()
    for name in args:
        fn = REGISTRY[name].fn
        best = (float("inf"), 0.0)
        for i in range(n):
            j0, s0 = _total_busy_jiffies(), _subtree_jiffies()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            ext = max(
                0, (_total_busy_jiffies() - j0) - (_subtree_jiffies() - s0)
            ) / _HZ
            print(f"  {name} attempt {i}: {dt:.3f}s ext={ext:.2f}core-s")
            if dt < best[0]:
                best = (dt, ext)
            spark.catalog.clearCache()
        print(f"{name}: best {best[0]:.3f}s ext={best[1]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
