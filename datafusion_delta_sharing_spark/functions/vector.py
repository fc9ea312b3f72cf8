"""Vector math over ``array<float>`` embedding columns.

Everything is expressed with Spark higher-order functions
(``zip_with``/``aggregate``) so the arithmetic runs JVM-side inside
whole-stage codegen — no Python in the hot path. Sums are sequential
left-to-right, matching DuckDB's ``list_sum(list_transform(...))`` order, so
rounded results are oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays (as double)."""
    prods = F.zip_with(_c(a), _c(b),
                       lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        _c(a), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def dot_sql(a: str, b: str) -> str:
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")


def l2_norm_sql(a: str) -> str:
    return (f"sqrt(list_sum(list_transform({a}, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)}))"
