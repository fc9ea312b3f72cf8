from datafusion_delta_sharing_spark.plans.predicates import (
    Op,
    ValueType,
    predicate_from_sql,
)

__all__ = ["Op", "ValueType", "predicate_from_sql"]
