"""esgopeta_spark — a PySpark-native engine with the query and
data-processing capabilities of cretz/esgopeta (a GUN graph-database
client), re-expressed Spark-first, plus the relational / streaming /
LLM-data-pipeline surface mandated for 100 TB-scale operation.

Layout
------
- ``types``      quad / update-message schemas (the canonical relations)
- ``ham``        HAM conflict resolution (reference: gun/state.go) as
                 both a pure-Python oracle and a distributed Spark merge
- ``soul``       soul (node-id) generation (reference: gun/node.go:14-21)
- ``graph``      GunGraph: path API, fetch/put with lazy parent creation
                 (reference: gun/scoped*.go)
- ``storage``    batch quad store: TTL retention, future-state holdback
                 (reference: gun/storage.go)
- ``streaming``  structured-streaming ingest + stateful HAM merge
                 (reference: gun/scoped_fetch.go live Fetch)
- ``operators``  analytics operators: dedup, similarity, text analysis,
                 as-of/range joins, top-k, multimodal plumbing
- ``plans``      the relational query catalog graded against DuckDB
"""

from esgopeta_spark.session import get_spark
from esgopeta_spark.ham import ham_merge, conflict_resolve
from esgopeta_spark.graph import GunGraph

__all__ = ["get_spark", "ham_merge", "conflict_resolve", "GunGraph"]

__version__ = "0.1.0"
