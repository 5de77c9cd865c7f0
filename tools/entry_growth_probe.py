"""Growth probe for catalog entries: time each named entry at sf0.01
and sf0.1 (noop-sink materialization, best-of-3, idle gate) and print
one JSON line per entry with the growth ratio — the SCALE.md evidence
shape.  Usage:

    python tools/entry_growth_probe.py entry_a entry_b ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_for_idle_box  # noqa: E402
from esgopeta_spark.session import get_spark  # noqa: E402

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]


def main(names: list[str]) -> None:
    from esgopeta_spark.plans import REGISTRY

    load, canary, mem_bw, cont = wait_for_idle_box()
    spark = get_spark("growth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"loadavg": round(load, 2), "canary_ms": canary,
                      "contaminated": cont}))
    for name in names:
        spec = REGISTRY[name]
        out = {"entry": name}
        for label, sf in SFS:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                spec.fn(spark, sf).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            out[label] = round(best, 3)
            spark.catalog.clearCache()
        out["growth"] = round(out["sf0.1"] / out["sf0.01"], 2)
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
