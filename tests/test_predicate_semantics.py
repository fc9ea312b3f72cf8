"""Semantics agreement: the json-predicate tree we send as
``jsonPredicateHints`` drives SERVER-side file pruning, while Spark applies
the same predicate string as the residual filter. If the tree's semantics
ever diverged from Spark's, a correct server could prune files whose rows
Spark would keep — silent wrong results. So: evaluate the parsed Op tree
row-by-row (three-valued logic) and require exact agreement with Spark's
filter on data with NULLs, for predicates spanning the whole grammar."""

import pytest
from pyspark.sql import types as T

from datafusion_delta_sharing_spark.errors import PredicateError
from datafusion_delta_sharing_spark.plans.predicates import predicate_from_sql
from tests.test_property_pruning import evaluate

SCHEMA = T.StructType([
    T.StructField("a", T.LongType()),
    T.StructField("b", T.LongType()),
])

ROWS = [
    {"a": a, "b": b}
    for a in [None, -5, 0, 3, 7, 25]
    for b in [None, -1, 3, 10]
]

PREDICATES = [
    "a = 3",
    "a < 7",
    "a <= 0",
    "a > 3",
    "a >= 25",
    "a IS NULL",
    "a IS NOT NULL",
    "NOT a = 3",
    "a = 3 AND b = 3",
    "a = 3 OR b = 3",
    "a < 5 AND b IS NULL",
    "NOT (a < 5 OR b > 5)",
    "a > 0 AND (b < 0 OR b IS NULL)",
    "(a = 0 OR a = 3) AND NOT b IS NULL",
]


@pytest.mark.parametrize("pred", PREDICATES)
def test_tree_semantics_match_spark_filter(spark, pred):
    df = spark.createDataFrame(ROWS, SCHEMA)
    spark_keep = {(r.a, r.b) for r in df.filter(pred).collect()}
    tree = predicate_from_sql(pred, SCHEMA)
    tree_keep = {(r["a"], r["b"]) for r in ROWS
                 if evaluate(tree, r) is True}  # SQL: only TRUE passes
    assert tree_keep == spark_keep, f"divergence on {pred!r}"


def test_column_to_column_comparison_refuses_pushdown():
    """col-vs-col comparisons are not expressible as json predicates
    (reference parity: Op::literal only wraps Expr::Literal) — the parser
    must refuse so the reader sends no hint and filters engine-side only."""
    with pytest.raises(PredicateError):
        predicate_from_sql("a <= b", SCHEMA)
