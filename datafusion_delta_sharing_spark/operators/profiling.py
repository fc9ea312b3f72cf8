"""Table profiling and data-quality operators.

The operations layer over shared tables: an ANALYZE-style per-column
profile (row/null/distinct counts, min/max), declarative quality
constraints (not-null / unique / accepted-values / range / referential),
and an equi-width histogram. All single-pass aggregations — the profile
computes every column's stats in ONE scan (a struct of aggregates melted
with stack), constraints are one aggregate over boolean indicator columns
(the referential check is the only join, against the dimension's key set),
and the histogram is a groupBy on a computed bucket. Each operator has a
DuckDB SQL mirror so the harness hash-checks values, not just shapes.

`n_distinct` is exact here (oracle-checkable); at 100 TB swap in
approx_count_distinct — the reading of the profile is the same.

String-typed min/max: values are rendered to strings so one schema covers
heterogeneous columns; profile only bigint/string/date columns (float
formatting differs across engines).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per column,
    computed in one scan: all columns' aggregates evaluated together, then
    melted with stack (no per-column jobs, no second scan)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"_mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_val, max_val)", "_n AS n_rows"
    ).select("column_name", "n_rows", "n_nulls", "n_distinct",
             "min_val", "max_val")


def table_profile_sql(source_sql: str, cols: list[str]) -> str:
    """DuckDB mirror: one aggregate row per column, unioned."""
    parts = [f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           min(CAST({c} AS VARCHAR)) AS min_val,
           max(CAST({c} AS VARCHAR)) AS max_val
    FROM {source_sql}""" for c in cols]
    return " UNION ALL ".join(parts)


def quality_checks(df: DataFrame, *,
                   not_null: list[str] = (),
                   unique: list[str] = (),
                   accepted_values: dict[str, list[str]] | None = None,
                   ranges: dict[str, tuple[float, float]] | None = None,
                   ) -> DataFrame:
    """(check_name, n_violations, passed) per declared constraint, all
    non-unique checks folded into ONE aggregate pass; each uniqueness
    check is its own groupBy (a shuffle on the checked key — unavoidable,
    that's what uniqueness means distributed)."""
    aggs = []
    for c in not_null:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"not_null:{c}"))
    for c, vals in (accepted_values or {}).items():
        aggs.append(F.sum(F.when(~F.col(c).isin(vals), 1).otherwise(0))
                    .alias(f"accepted_values:{c}"))
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(F.sum(F.when((F.col(c) < lo) | (F.col(c) > hi), 1)
                          .otherwise(0)).alias(f"range:{c}"))
    parts = []
    if aggs:
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{a}', `{a}`" for a in
            [f"not_null:{c}" for c in not_null]
            + [f"accepted_values:{c}" for c in (accepted_values or {})]
            + [f"range:{c}" for c in (ranges or {})])
        n = len(not_null) + len(accepted_values or {}) + len(ranges or {})
        parts.append(wide.selectExpr(
            f"stack({n}, {stack_args}) AS (check_name, n_violations)"))
    for c in unique:
        dup = (df.groupBy(c).agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > 1)
               .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("n_violations"))
               .select(F.lit(f"unique:{c}").alias("check_name"),
                       "n_violations"))
        parts.append(dup)
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.withColumn("passed", F.col("n_violations") == 0)


def quality_checks_sql(source_sql: str, *,
                       not_null: list[str] = (),
                       unique: list[str] = (),
                       accepted_values: dict[str, list[str]] | None = None,
                       ranges: dict[str, tuple[float, float]] | None = None,
                       ) -> str:
    """DuckDB mirror of quality_checks."""
    parts = []
    for c in not_null:
        parts.append(
            f"SELECT 'not_null:{c}' AS check_name, CAST(sum(CASE WHEN {c} "
            f"IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations "
            f"FROM {source_sql}")
    for c, vals in (accepted_values or {}).items():
        lit = ", ".join(f"'{v}'" for v in vals)
        parts.append(
            f"SELECT 'accepted_values:{c}', CAST(sum(CASE WHEN {c} NOT IN "
            f"({lit}) THEN 1 ELSE 0 END) AS BIGINT) FROM {source_sql}")
    for c, (lo, hi) in (ranges or {}).items():
        parts.append(
            f"SELECT 'range:{c}', CAST(sum(CASE WHEN {c} < {lo} OR {c} > {hi}"
            f" THEN 1 ELSE 0 END) AS BIGINT) FROM {source_sql}")
    for c in unique:
        parts.append(
            f"SELECT 'unique:{c}', CAST(coalesce(sum(_n), 0) AS BIGINT) FROM "
            f"(SELECT count(*) AS _n FROM {source_sql} GROUP BY {c} "
            f"HAVING count(*) > 1)")
    union = " UNION ALL ".join(parts)
    return (f"SELECT check_name, n_violations, n_violations = 0 AS passed "
            f"FROM ({union})")


def equi_width_histogram(df: DataFrame, col: str, lo: float, hi: float,
                         n_buckets: int) -> DataFrame:
    """(bucket, n) equi-width counts over [lo, hi); values outside clamp to
    the edge buckets (so the histogram is total). One groupBy on a
    computed bucket — a single shuffle of n_buckets partial counts."""
    w = (hi - lo) / n_buckets
    bucket = F.least(
        F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(n_buckets - 1)).cast("bigint")
    return (df.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n")))


def equi_width_histogram_sql(source_sql: str, col: str, lo: float, hi: float,
                             n_buckets: int) -> str:
    """DuckDB mirror of equi_width_histogram."""
    w = (hi - lo) / n_buckets
    b = (f"CAST(least(greatest(floor(({col} - {lo}) / {w}), 0), "
         f"{n_buckets - 1}) AS BIGINT)")
    return (f"SELECT {b} AS bucket, CAST(count(*) AS BIGINT) AS n "
            f"FROM {source_sql} GROUP BY 1")
