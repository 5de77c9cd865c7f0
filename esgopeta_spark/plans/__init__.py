from esgopeta_spark.plans.catalog import REGISTRY, QuerySpec
import esgopeta_spark.plans.catalog_ext  # noqa: F401  (registers extended queries)
import esgopeta_spark.plans.catalog_scale  # noqa: F401  (as-of/range joins, embedding dedup, IVF, TPC-H depth)

__all__ = ["REGISTRY", "QuerySpec"]
