"""Capture .explain("formatted") for headline queries into plans/r14/.

Usage:
    python tools/explain_r14.py before            # all headline queries
    python tools/explain_r14.py after q1 q2 ...   # just the named ones

Writes plans/r14/<query>_<tag>.txt.  Plan capture only — nothing is
executed (explain analyzes/plans but runs no job), so it is safe on a
busy box; timing comes from bench.py, never from here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esgopeta_spark.plans import REGISTRY
from esgopeta_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py"))
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("esgopeta-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
