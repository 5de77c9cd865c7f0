"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are generated from the engine's query
catalog (esgopeta_spark/plans/catalog.py), one entry per implemented
operator family from SURVEY.md §2.  ``entry`` runs the flagship
graph-engine query (HAM last-write-wins merge over an events-derived
update log) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from esgopeta_spark.plans import REGISTRY

    return REGISTRY["graph_ham_merge_events"].fn(spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from esgopeta_spark.plans import REGISTRY

    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; entries are
    omitted (driver records rows-only) for approximate/LSH operators whose
    banding is not SQL-expressible — those are verified in tests/ against
    brute-force oracles instead."""
    from esgopeta_spark.plans import REGISTRY

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
