"""ML feature-preparation operators for training-data pipelines.

Reference parity: the reference's relational surface (delegated to
DataFusion, src/lib.rs:16-21) covers the aggregate/join machinery these
compose; the operators themselves are the standard tabular-ML feature
steps a corpus pipeline runs before training:

* :func:`target_encode_loo` — smoothed LEAVE-ONE-OUT target encoding
  (the Micci-Barreca 2001 scheme): each row's category is replaced by
  the category's target mean computed WITHOUT the row itself, blended
  toward the global mean by a smoothing pseudo-count. LOO prevents the
  direct target leakage naive mean-encoding has.
* :func:`ols_fit_2f` — exact closed-form ordinary least squares with two
  features + intercept via the normal equations (Cramer's rule on the
  centered cross-moment matrix).

Determinism contract (the repo-wide rule, see functions/money.py): every
sum is an exact BIGINT over integer-quantized inputs; doubles appear
only in a FIXED-shape expression both engines parse identically, so the
IEEE operations and their order are identical.

Scale posture: target encoding is two hash aggregates (category stats,
global scalar) + one broadcastable join — no per-row state; OLS is a
single partial+final aggregate emitting one row per group, then a
per-row closed form. Both are one-pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def target_encode_loo(df: DataFrame, cat_col: str, target_col: str,
                      id_col: str, smoothing: int = 20) -> DataFrame:
    """Smoothed leave-one-out target encoding.

    ``target_col`` must be an exact integer column (cents / 0-1 flags);
    the category and global sums are then exact, and the encoding is the
    one double division ``(S_c - t_i + m * G) / (n_c - 1 + m)`` where
    ``G = S_all / n_all`` is the global mean. A singleton category
    (``n_c = 1``) degrades to the smoothed global mean, never 0/0.

    Returns (id, cat, target, enc). ``enc`` is deliberately NOT
    rounded: the expression tree is identical on both engines so the
    raw double is bit-exact, while round(x, 6) on a cents-scale
    magnitude (~1e7) is where the engines diverge — Spark rounds the
    exact decimal expansion via BigDecimal, DuckDB rounds in float
    (measured: 2/15k rows flipped the 6th decimal at sf0.01).
    """
    cat_stats = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("__s_c"),
        F.count(F.lit(1)).alias("__n_c"))
    glob = df.agg(
        (F.sum(target_col).cast("double")
         / F.count(F.lit(1))).alias("__g"))
    m = F.lit(smoothing)
    enc = ((F.col("__s_c") - F.col(target_col) + m * F.col("__g"))
           / (F.col("__n_c") - 1 + m))
    return (df.select(id_col, cat_col, target_col)
            .join(F.broadcast(cat_stats), cat_col)
            .join(F.broadcast(glob))
            .select(F.col(id_col), F.col(cat_col), F.col(target_col),
                    enc.alias("enc")))


def target_encode_loo_sql(source_sql: str, cat_col: str, target_col: str,
                          id_col: str, smoothing: int = 20) -> str:
    """DuckDB mirror of :func:`target_encode_loo` — same derivation:
    exact integer sums, one double division, identical expression
    shape."""
    return f"""
        SELECT r.{id_col}, r.{cat_col}, r.{target_col},
               (c.s_c - r.{target_col} + {smoothing} * g.g)
                   / (c.n_c - 1 + {smoothing}) AS enc
        FROM ({source_sql}) r
        JOIN (SELECT {cat_col}, sum({target_col}) AS s_c,
                     count(*) AS n_c
              FROM ({source_sql}) GROUP BY {cat_col}) c
          ON c.{cat_col} = r.{cat_col}
        CROSS JOIN (SELECT CAST(sum({target_col}) AS DOUBLE) / count(*)
                           AS g
                    FROM ({source_sql})) g
    """


# -- closed-form OLS ----------------------------------------------------------

# Ten exact BIGINT raw sums — the caller quantizes inputs so sum(y*y)
# fits int64; this is the only pass over the data.
_OLS_SUMS = ("count(*) AS n, sum(x1) AS sx1, sum(x2) AS sx2, "
             "sum(y) AS sy, sum(x1 * x1) AS sx1x1, "
             "sum(x2 * x2) AS sx2x2, sum(x1 * x2) AS sx1x2, "
             "sum(x1 * y) AS sx1y, sum(x2 * y) AS sx2y, "
             "sum(y * y) AS syy")


def _ols_tail_sql(sums_src: str, group_col: str) -> str:
    """Cramer's-rule closed form over a (group, ten-sums) relation —
    ONE SQL text both engines parse, so the double arithmetic is
    bit-identical. Centered moments from raw sums
    (``Sab = n*Σab − Σa*Σb``) are formed in DOUBLE: the products can
    exceed int64 at large n, and IEEE rounding of identical inputs is
    identical on both engines. Degenerate groups (det = 0, e.g. a
    constant feature) yield NULL coefficients instead of a divide
    error; r2 is NULL when the target is constant."""
    return f"""
        SELECT {group_col}, CAST(n AS BIGINT) AS n,
               round(CASE WHEN det = 0 THEN NULL
                          ELSE (CAST(sy AS DOUBLE)
                                - ((sx1y_c * sx2x2_c - sx2y_c * sx1x2_c)
                                   / det) * sx1
                                - ((sx2y_c * sx1x1_c - sx1y_c * sx1x2_c)
                                   / det) * sx2) / n END, 6) AS b0,
               round(CASE WHEN det = 0 THEN NULL
                          ELSE (sx1y_c * sx2x2_c - sx2y_c * sx1x2_c)
                               / det END, 6) AS b1,
               round(CASE WHEN det = 0 THEN NULL
                          ELSE (sx2y_c * sx1x1_c - sx1y_c * sx1x2_c)
                               / det END, 6) AS b2,
               round(CASE WHEN det = 0 OR syy_c = 0 THEN NULL
                          ELSE ((sx1y_c * sx2x2_c - sx2y_c * sx1x2_c)
                                / det * sx1y_c
                                + (sx2y_c * sx1x1_c - sx1y_c * sx1x2_c)
                                  / det * sx2y_c) / syy_c END, 6) AS r2
        FROM (
            SELECT {group_col}, n, sx1, sx2, sy, sx1y_c, sx2y_c, syy_c,
                   sx1x1_c, sx2x2_c, sx1x2_c,
                   sx1x1_c * sx2x2_c - sx1x2_c * sx1x2_c AS det
            FROM (
                SELECT {group_col}, n, sx1, sx2, sy,
                       CAST(n AS DOUBLE) * sx1x1
                           - CAST(sx1 AS DOUBLE) * sx1 AS sx1x1_c,
                       CAST(n AS DOUBLE) * sx2x2
                           - CAST(sx2 AS DOUBLE) * sx2 AS sx2x2_c,
                       CAST(n AS DOUBLE) * sx1x2
                           - CAST(sx1 AS DOUBLE) * sx2 AS sx1x2_c,
                       CAST(n AS DOUBLE) * sx1y
                           - CAST(sx1 AS DOUBLE) * sy AS sx1y_c,
                       CAST(n AS DOUBLE) * sx2y
                           - CAST(sx2 AS DOUBLE) * sy AS sx2y_c,
                       CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy AS syy_c
                FROM {sums_src}
            )
        )
    """


def ols_fit_2f(spark, xy: DataFrame, group_col: str) -> DataFrame:
    """Per-group two-feature OLS ``y ~ b0 + b1*x1 + b2*x2`` over a frame
    with exact-integer columns (group, x1, x2, y). Returns
    (group, n, b0, b1, b2, r2) rounded to 6 — r2 here is the explained
    variance of the FITTED model (b·S_xy / S_yy), the standard
    coefficient of determination for the least-squares solution."""
    xy.createOrReplaceTempView("_ols_xy")
    spark.sql(
        f"SELECT {group_col}, {_OLS_SUMS} FROM _ols_xy "
        f"GROUP BY {group_col}"
    ).createOrReplaceTempView("_ols_sums")
    return spark.sql(_ols_tail_sql("_ols_sums", group_col))


def ols_fit_2f_sql(xy_sql: str, group_col: str) -> str:
    """DuckDB mirror of :func:`ols_fit_2f` — the same raw-sum aggregate
    and the IDENTICAL Cramer tail text (shared `_ols_tail_sql`)."""
    sums = (f"(SELECT {group_col}, {_OLS_SUMS} FROM ({xy_sql}) "
            f"GROUP BY {group_col})")
    return _ols_tail_sql(sums, group_col)
