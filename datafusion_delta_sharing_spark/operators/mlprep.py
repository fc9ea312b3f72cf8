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


# -- Newton/IRLS logistic regression ------------------------------------------

# Round 1 runs from b = (0, 0), where the sigmoid is EXACTLY 1/2 and the
# IRLS weight exactly 1/4 — no exp() anywhere, so the first Newton step
# is pure integer sums + one double division per coefficient and is
# bit-identical across engines. Later rounds evaluate exp() on
# coefficients that differ between engines only by accumulated IEEE
# rounding (~1e-15); the final round(…, 5) absorbs both engines' libm
# last-ulp drift (the zipf_fit ln() precedent). ONE shared SQL text per
# stage keeps the expression shapes identical.
_LOGREG_STEP1_SQL = (
    "SELECT {g}, n, sx, sxx, "
    "       4.0 * ((sy - n / 2.0) * sxx - (sxy - sx / 2.0) * sx) "
    "           / det AS b0, "
    "       4.0 * ((sxy - sx / 2.0) * n - (sy - n / 2.0) * sx) "
    "           / det AS b1 "
    "FROM (SELECT {g}, n, sx, sxx, sy, sxy, "
    "             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx "
    "                 AS det "
    "      FROM (SELECT {g}, count(*) AS n, sum(x) AS sx, "
    "                   sum(x * x) AS sxx, sum(y) AS sy, "
    "                   sum(x * y) AS sxy "
    "            FROM {src} GROUP BY {g})) "
    "WHERE det != 0")

# one IRLS/Newton round from per-group (b0, b1): p = sigmoid(b0 + b1 x),
# w = p (1 - p); step = H^-1 g with H = [[Σw, Σwx], [Σwx, Σwx²]],
# g = [Σ(y - p), Σx(y - p)] — 2x2 Cramer, degenerate Hessian -> NULL
_LOGREG_STEPN_SQL = (
    "SELECT {g}, n, sx, sxx, "
    "       b0 + (g0 * h11 - g1 * h01) / det AS b0, "
    "       b1 + (g1 * h00 - g0 * h01) / det AS b1 "
    "FROM (SELECT {g}, n, sx, sxx, b0, b1, g0, g1, h00, h01, h11, "
    "             h00 * h11 - h01 * h01 AS det "
    "      FROM (SELECT {g}, count(*) AS n, sum(x) AS sx, "
    "                   sum(x * x) AS sxx, "
    "                   max(b0) AS b0, max(b1) AS b1, "
    "                   sum(y - p) AS g0, sum(x * (y - p)) AS g1, "
    "                   sum(p * (1.0 - p)) AS h00, "
    "                   sum(x * p * (1.0 - p)) AS h01, "
    "                   sum(x * x * p * (1.0 - p)) AS h11 "
    "            FROM (SELECT {g}, x, y, b0, b1, "
    "                         1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p "
    "                  FROM {src}) "
    "            GROUP BY {g})) "
    "WHERE det != 0")

_LOGREG_FINAL_SQL = (
    "SELECT {g}, CAST(n AS BIGINT) AS n, "
    "       round(b0, 5) AS b0, round(b1, 5) AS b1, "
    "       round(ll / n, 5) AS avg_ll "
    "FROM (SELECT {g}, count(*) AS n, max(b0) AS b0, max(b1) AS b1, "
    "             sum(y * ln(p) + (1.0 - y) * ln(1.0 - p)) AS ll "
    "      FROM (SELECT {g}, y, b0, b1, "
    "                   1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p "
    "            FROM {src}) "
    "      GROUP BY {g})")

# Cell-table forms of the three stages (r11, guide §2.3 "aggregate
# before you shuffle" / VERDICT r10 #8): x is a quantized integer and
# y ∈ {0, 1}, so EVERY per-round statistic is a sum over (g, x, y)
# cells weighted by the cell count — one pass over the raw rows builds
# the cell table, and rounds 2..R plus the final log-likelihood run
# over |groups|·|x|·2 rows instead of re-scanning the data each round
# (4 full passes → 1 at any scale; the adaboost contingency-cell
# pattern). Integer sums (n, sx, sxx, sy, sxy) are EXACT and identical
# to the raw form; the double sums (gradient/Hessian/ll terms) multiply
# each cell's constant term by cnt instead of adding cnt copies — an
# IEEE re-association within the same ~1e-15 class as the cross-engine
# partial-aggregation drift the final round(…, 5) already absorbs
# (verified bit-identical to the raw form AND the DuckDB oracle at
# sf0.001/0.01/0.1).
_LOGREG_CELLS_SQL = (
    "SELECT {g}, x, y, count(*) AS cnt FROM {src} GROUP BY {g}, x, y")

_LOGREG_STEP1_CELLS_SQL = (
    "SELECT {g}, n, sx, sxx, "
    "       4.0 * ((sy - n / 2.0) * sxx - (sxy - sx / 2.0) * sx) "
    "           / det AS b0, "
    "       4.0 * ((sxy - sx / 2.0) * n - (sy - n / 2.0) * sx) "
    "           / det AS b1 "
    "FROM (SELECT {g}, n, sx, sxx, sy, sxy, "
    "             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx "
    "                 AS det "
    "      FROM (SELECT {g}, sum(cnt) AS n, sum(x * cnt) AS sx, "
    "                   sum(x * x * cnt) AS sxx, sum(y * cnt) AS sy, "
    "                   sum(x * y * cnt) AS sxy "
    "            FROM {src} GROUP BY {g})) "
    "WHERE det != 0")

_LOGREG_STEPN_CELLS_SQL = (
    "SELECT {g}, n, sx, sxx, "
    "       b0 + (g0 * h11 - g1 * h01) / det AS b0, "
    "       b1 + (g1 * h00 - g0 * h01) / det AS b1 "
    "FROM (SELECT {g}, n, sx, sxx, b0, b1, g0, g1, h00, h01, h11, "
    "             h00 * h11 - h01 * h01 AS det "
    "      FROM (SELECT {g}, sum(cnt) AS n, sum(x * cnt) AS sx, "
    "                   sum(x * x * cnt) AS sxx, "
    "                   max(b0) AS b0, max(b1) AS b1, "
    "                   sum(cnt * (y - p)) AS g0, "
    "                   sum(cnt * x * (y - p)) AS g1, "
    "                   sum(cnt * p * (1.0 - p)) AS h00, "
    "                   sum(cnt * x * p * (1.0 - p)) AS h01, "
    "                   sum(cnt * x * x * p * (1.0 - p)) AS h11 "
    "            FROM (SELECT {g}, x, y, cnt, b0, b1, "
    "                         1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p "
    "                  FROM {src}) "
    "            GROUP BY {g})) "
    "WHERE det != 0")

_LOGREG_FINAL_CELLS_SQL = (
    "SELECT {g}, CAST(n AS BIGINT) AS n, "
    "       round(b0, 5) AS b0, round(b1, 5) AS b1, "
    "       round(ll / n, 5) AS avg_ll "
    "FROM (SELECT {g}, sum(cnt) AS n, max(b0) AS b0, max(b1) AS b1, "
    "             sum(cnt * (y * ln(p) + (1.0 - y) * ln(1.0 - p))) "
    "                 AS ll "
    "      FROM (SELECT {g}, y, cnt, b0, b1, "
    "                   1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p "
    "            FROM {src}) "
    "      GROUP BY {g})")


def logreg_fit_1f(spark, xy: DataFrame, group_col: str,
                  rounds: int) -> DataFrame:
    """Per-group one-feature logistic regression ``P(y=1) =
    sigmoid(b0 + b1·x)`` via ``rounds`` Newton/IRLS steps over an
    exact-integer (group, x, y∈{0,1}) frame, returning
    (group, n, b0, b1, avg_ll) with coefficients and the mean
    log-likelihood rounded to 5.

    Scale shape mirrors :func:`ols_fit_2f` / kmeans: each round is ONE
    hash aggregate over the data; the per-group coefficients re-enter
    the next round through a broadcast join of a #groups-row frame
    (driver state bounded by the group count, the kmeans k-row
    contract). Degenerate groups (constant x, or a singular IRLS
    Hessian) drop out at the round that detects them, exactly like the
    oracle's ``det != 0`` filter."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    g = group_col
    xy.createOrReplaceTempView("_lr_xy")
    # ONE pass over the raw rows builds the (g, x, y, cnt) cell table;
    # every later round and the final log-likelihood aggregate the
    # cells (bounded by |groups| × |x buckets| × 2 — never larger than
    # the input, tiny for quantized features). Lazy checkpoint: the
    # first round's collect materializes it, the remaining rounds and
    # the returned final plan reuse the RDD instead of re-scanning the
    # raw frame (r11, guide §2.3 — 4 data passes → 1).
    cells = spark.sql(
        _LOGREG_CELLS_SQL.format(g=g, src="_lr_xy")).localCheckpoint(
        eager=False)
    cells.createOrReplaceTempView("_lr_cells")
    coef = spark.sql(_LOGREG_STEP1_CELLS_SQL.format(g=g, src="_lr_cells"))
    for _ in range(rounds - 1):
        # #groups-row frame, re-entering via a broadcast equi-join —
        # collect + literals would hardcode group VALUES in the plan
        joined = cells.join(F.broadcast(coef.select(g, "b0", "b1")), g)
        joined.createOrReplaceTempView("_lr_joined")
        coef = spark.sql(
            _LOGREG_STEPN_CELLS_SQL.format(g=g, src="_lr_joined"))
        coef = spark.createDataFrame(coef.collect(), coef.schema)
    final = cells.join(F.broadcast(coef.select(g, "b0", "b1")), g)
    final.createOrReplaceTempView("_lr_final")
    return spark.sql(_LOGREG_FINAL_CELLS_SQL.format(g=g, src="_lr_final"))


def logreg_fit_1f_sql(xy_sql: str, group_col: str, rounds: int) -> str:
    """DuckDB mirror of :func:`logreg_fit_1f`: the round loop unrolled
    into chained CTEs over the SAME per-stage SQL texts, the per-group
    coefficients re-entering each round through a USING({g}) join (what
    the Spark side does with the broadcast frame)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    g = group_col
    ctes = [f"p0 AS ({xy_sql})",
            "m1 AS (" + _LOGREG_STEP1_SQL.format(g=g, src="p0") + ")"]
    for r in range(2, rounds + 1):
        ctes.append(
            f"j{r} AS (SELECT p0.*, m{r - 1}.b0, m{r - 1}.b1 "
            f"FROM p0 JOIN m{r - 1} USING ({g}))")
        ctes.append(
            f"m{r} AS ("
            + _LOGREG_STEPN_SQL.format(g=g, src=f"j{r}") + ")")
    final_src = (f"(SELECT p0.*, m{rounds}.b0, m{rounds}.b1 "
                 f"FROM p0 JOIN m{rounds} USING ({g}))")
    return ("WITH " + ", ".join(ctes) + " "
            + _LOGREG_FINAL_SQL.format(g=g, src=final_src))


# -- optimal decision stump ----------------------------------------------------

# All split statistics are EXACT BIGINT counts from one per-(group, x)
# aggregate + one cumulative window over the ordered x buckets; the
# weighted Gini impurity of each candidate split is a fixed-shape
# double expression over those integers, so both engines compute
# bit-identical doubles and the argmin row is the same one. Ties break
# on the smaller threshold. The last bucket (empty right side) is not a
# split and is filtered out.
_STUMP_SQL = (
    "SELECT {g}, CAST(split AS BIGINT) AS split, "
    "       CAST(n AS BIGINT) AS n, "
    "       round(gini_parent - gini_split, 6) AS gain, "
    "       round(CAST(pos_l AS DOUBLE) / n_l, 6) AS rate_left, "
    "       round(CAST(pos - pos_l AS DOUBLE) / (n - n_l), 6) "
    "           AS rate_right "
    "FROM ("
    "  SELECT {g}, split, n, pos, n_l, pos_l, gini_split, gini_parent, "
    "         row_number() OVER (PARTITION BY {g} "
    "                            ORDER BY gini_split, split) AS rk "
    "  FROM ("
    "    SELECT {g}, split, n, pos, n_l, pos_l, "
    "           (n_l - (CAST(pos_l AS DOUBLE) * pos_l "
    "                   + CAST(n_l - pos_l AS DOUBLE) * (n_l - pos_l)) "
    "                  / n_l "
    "            + (n - n_l) "
    "            - (CAST(pos - pos_l AS DOUBLE) * (pos - pos_l) "
    "               + CAST((n - n_l) - (pos - pos_l) AS DOUBLE) "
    "                 * ((n - n_l) - (pos - pos_l))) / (n - n_l)) / n "
    "               AS gini_split, "
    "           (n - (CAST(pos AS DOUBLE) * pos "
    "                 + CAST(n - pos AS DOUBLE) * (n - pos)) / n) / n "
    "               AS gini_parent "
    "    FROM ("
    "      SELECT {g}, x AS split, "
    "             sum(cnt) OVER w AS n_l, sum(p) OVER w AS pos_l, "
    "             sum(cnt) OVER t AS n, sum(p) OVER t AS pos "
    "      FROM (SELECT {g}, x, count(*) AS cnt, sum(y) AS p "
    "            FROM {src} GROUP BY {g}, x) "
    "      WINDOW w AS (PARTITION BY {g} ORDER BY x "
    "                   ROWS BETWEEN UNBOUNDED PRECEDING "
    "                   AND CURRENT ROW), "
    "             t AS (PARTITION BY {g}) "
    "    ) WHERE n_l < n"
    "  )"
    ") WHERE rk = 1")


def stump_fit(spark, xy: DataFrame, group_col: str) -> DataFrame:
    """Per-group optimal depth-1 decision stump ``x <= split`` for a
    binary target over an exact-integer (group, x, y∈{0,1}) frame:
    the split minimizing weighted Gini impurity, with the impurity
    gain and the two leaf rates (rounded to 6). Exhaustive over every
    candidate threshold, but the scan is ONE aggregate to the
    per-(group, x) bucket table + ONE cumulative window over the
    ordered buckets — cost bounded by distinct x per group (the
    caller's quantization), never by data pairs. The classic weak
    learner / quality-filter feature screen next to
    :func:`logreg_fit_1f`."""
    xy.createOrReplaceTempView("_stump_xy")
    return spark.sql(_STUMP_SQL.format(g=group_col, src="_stump_xy"))


def stump_fit_sql(xy_sql: str, group_col: str) -> str:
    """DuckDB mirror of :func:`stump_fit` — the IDENTICAL SQL text over
    the wrapped source."""
    return _STUMP_SQL.format(g=group_col, src=f"({xy_sql})")


# -- split conformal prediction ------------------------------------------------

# Split conformal (Vovk et al.; Lei et al. 2018 formulation): fit on the
# proper-training fold, take the ceil((n_cal+1)*(1-alpha))-th smallest
# absolute residual on the calibration fold as q-hat, report the exact
# empirical coverage of [y_hat - q, y_hat + q] on the test fold. Every
# step is cross-engine bit-exact BY CONSTRUCTION, not by rounding:
# the one-feature OLS coefficients come from exact BIGINT sums through
# one fixed-shape double expression; each score |y - (b0 + b1*x)| is
# per-row arithmetic on identical doubles (no double SUM anywhere); the
# quantile is an ORDER STATISTIC picked by a (score, id) row_number —
# identical doubles sort identically — with the rank computed in pure
# integer arithmetic (10*k = (9*(n+1)+9) - ((9*(n+1)+9) % 10), i.e.
# ceil(9*(n+1)/10) via modulo subtraction — no division, no doubles);
# and the coverage count compares identical doubles, so it is an exact
# integer.
# ONE SQL text, both engines. The rank is capped at n_cal (k > n_cal
# means the finite-sample interval is infinite; with alpha = 0.1 that
# only happens for n_cal < 9, surfaced by cal_too_small = true). A
# group with NO calibration rows at all is the extreme of the same
# condition: the qhat LEFT JOIN keeps it, with qhat/covered/coverage
# NULL and cal_too_small = 1 — dropping it silently would hide
# exactly what the flag exists to surface (r10-continuation review).
_CONFORMAL_SQL = (
    "WITH xy AS (SELECT * FROM {src}), "
    "coef AS ("
    "  SELECT {g}, n_tr, "
    "         (CAST(n_tr AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) "
    "             / det AS b1, "
    "         (sy - ((CAST(n_tr AS DOUBLE) * sxy "
    "                 - CAST(sx AS DOUBLE) * sy) / det) * sx) / n_tr "
    "             AS b0 "
    "  FROM (SELECT {g}, n_tr, sx, sy, sxy, "
    "               CAST(n_tr AS DOUBLE) * sxx "
    "                   - CAST(sx AS DOUBLE) * sx AS det "
    "        FROM (SELECT {g}, count(*) AS n_tr, sum(x) AS sx, "
    "                     sum(y) AS sy, sum(x * x) AS sxx, "
    "                     sum(x * y) AS sxy "
    "              FROM xy WHERE fold <= 5 GROUP BY {g})) "
    "  WHERE det != 0), "
    "cal AS ("
    "  SELECT xy.{g}, abs(y - (b0 + b1 * x)) AS score, id, "
    "         row_number() OVER (PARTITION BY xy.{g} "
    "                            ORDER BY abs(y - (b0 + b1 * x)), id) "
    "             AS rn, "
    "         count(*) OVER (PARTITION BY xy.{g}) AS n_cal "
    "  FROM xy JOIN coef ON xy.{g} = coef.{g} "
    "  WHERE fold IN (6, 7)), "
    "qhat AS ("
    "  SELECT {g}, n_cal, score AS q, "
    "         k10 > 10 * n_cal AS cal_too_small "
    "  FROM (SELECT {g}, n_cal, score, rn, "
    "               (9 * (n_cal + 1) + 9) "
    "                   - ((9 * (n_cal + 1) + 9) % 10) AS k10 "
    "        FROM cal) "
    "  WHERE rn * 10 = CASE WHEN k10 > 10 * n_cal "
    "                       THEN 10 * n_cal ELSE k10 END) "
    "SELECT xy.{g}, max(n_tr) AS n_tr, "
    "       CAST(coalesce(max(n_cal), 0) AS BIGINT) AS n_cal, "
    "       count(*) AS n_test, round(max(q), 6) AS qhat, "
    "       CASE WHEN max(q) IS NULL THEN NULL "
    "            ELSE CAST(sum(CASE WHEN abs(y - (b0 + b1 * x)) <= q "
    "                          THEN 1 ELSE 0 END) AS BIGINT) END "
    "           AS covered, "
    "       CASE WHEN max(q) IS NULL THEN NULL "
    "            ELSE round(CAST(sum(CASE WHEN abs(y - (b0 + b1 * x)) "
    "                                     <= q THEN 1 ELSE 0 END) "
    "                            AS DOUBLE) / count(*), 6) END "
    "           AS coverage, "
    "       CASE WHEN max(q) IS NULL THEN 1 "
    "            ELSE max(CASE WHEN cal_too_small THEN 1 ELSE 0 END) "
    "            END AS cal_too_small "
    "FROM xy "
    "JOIN coef ON xy.{g} = coef.{g} "
    "LEFT JOIN qhat ON xy.{g} = qhat.{g} "
    "WHERE fold >= 8 "
    "GROUP BY xy.{g}")


def conformal_interval_1f(spark, xy: DataFrame, group_col: str,
                          ) -> DataFrame:
    """Per-group split conformal prediction at alpha = 0.1 over an
    exact-integer frame (group, x, y, id, fold): OLS ``y ~ b0 + b1*x``
    is fit on folds 0-5, q-hat is the ceil(0.9*(n_cal+1))-th smallest
    |residual| on folds 6-7, and the returned row reports the EXACT
    coverage of the +-q-hat band on folds 8-9. Returns (group, n_tr,
    n_cal, n_test, qhat, covered, coverage, cal_too_small).

    Scale shape: one hash aggregate for the fit, a broadcastable
    #groups-row coefficient join, per-row scoring, and ONE rank window
    over the calibration fold only (partitioned by group — at larger
    calibration folds swap the order statistic for approx_percentile;
    the exact window is kept here because the oracle needs the exact
    finite-sample quantile). Coverage is a plain filtered count."""
    xy.createOrReplaceTempView("_conf_xy")
    return spark.sql(_CONFORMAL_SQL.format(g=group_col, src="_conf_xy"))


def conformal_interval_1f_sql(xy_sql: str, group_col: str) -> str:
    """DuckDB mirror of :func:`conformal_interval_1f` — the IDENTICAL
    SQL text over the wrapped source."""
    return _CONFORMAL_SQL.format(g=group_col, src=f"({xy_sql})")
