from esgopeta_spark.plans.catalog import REGISTRY, QuerySpec
import esgopeta_spark.plans.catalog_ext  # noqa: F401  (registers extended queries)
import esgopeta_spark.plans.catalog_scale  # noqa: F401  (as-of/range joins, embedding dedup, IVF, TPC-H depth)
import esgopeta_spark.plans.catalog_tpch2  # noqa: F401  (TPC-H depth part 2: q7 q8 q13 q17 q19 q21 q22)
import esgopeta_spark.plans.catalog_graphx  # noqa: F401  (GraphX-style analytics: pagerank, triangles)

__all__ = ["REGISTRY", "QuerySpec"]
