"""Vector math over ``array<float>`` embedding columns.

Everything is expressed with Spark higher-order functions
(``zip_with``/``aggregate``) so the arithmetic runs JVM-side inside
whole-stage codegen — no Python in the hot path. Sums are sequential
left-to-right, matching DuckDB's ``list_sum(list_transform(...))`` order, so
rounded results are oracle-comparable.

Input contract (r5 review): vectors must be NON-NULL, fixed-dimension,
null-free arrays — the edge semantics diverge across engines otherwise
(Spark's ``aggregate`` propagates a NULL element to a NULL sum while
DuckDB's ``list_sum`` skips NULLs; an empty array sums to 0.0 in Spark
and NULL in DuckDB). The harness embeddings satisfy this by
construction; pipelines feeding ragged or nullable vectors must clean
them first.
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
