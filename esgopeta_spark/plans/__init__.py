from esgopeta_spark.plans.catalog import REGISTRY, QuerySpec
import esgopeta_spark.plans.catalog_ext  # noqa: F401  (registers extended queries)

__all__ = ["REGISTRY", "QuerySpec"]
