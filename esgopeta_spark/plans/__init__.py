from esgopeta_spark.plans.catalog import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
