"""AdaBoost over depth-1 stumps — ensemble training as scan + metadata.

Discrete AdaBoost (Freund & Schapire 1997) with exhaustive decision
stumps, per group, over an exact-integer (group, x, y∈{0,1}) frame.
The engine-relevant insight is representational: a stump's hypothesis
depends only on the x bucket, so instance weights stay CONSTANT within
each (group, x, y) contingency cell — the whole boosting loop runs on
the aggregated cell table (#groups × #buckets rows, the caller's
quantization), never re-touching raw rows. At 100 TB that is ONE hash
aggregate over the data followed by T metadata-sized rounds — the same
k-row-state contract as kmeans / logreg_fit_1f.

Reference parity: the aggregation/window machinery is the reference's
DataFusion-delegated surface (src/lib.rs:16-21); the algorithm is the
published one (alpha_t = 0.5·ln((W−err)/err), weights scaled by
exp(∓alpha)).

Determinism contract: cell counts are exact BIGINTs; round-1 candidate
errors are sums of integer-valued doubles (exact in IEEE up to 2^53,
any order); later rounds' weighted sums ride ordered cumulative
windows over ≤ #buckets cells (cross-engine drift ≤ ~1e-15, absorbed
by planted-law error gaps of order 1e-2 — the logreg_fit precedent);
argmin ties break on (err, split, pol); alphas are rounded to 5 only
in the OUTPUT, and ``min_abs_score`` attests every ensemble sign
decision sits far above the drift band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# ONE SQL text per stage, both engines (the logreg_fit_1f pattern:
# Spark runs each text over temp views; the DuckDB oracle unrolls the
# same texts into chained CTEs).

# initial cells: exact counts + unit weights. wp weighs each positive
# instance in the bucket, wn each negative.
_ADA_CELLS_SQL = (
    "SELECT {g}, x, count(*) AS cnt, sum(y) AS pos, "
    "       CAST(1.0 AS DOUBLE) AS wp, CAST(1.0 AS DOUBLE) AS wn "
    "FROM {src} GROUP BY {g}, x")

# best stump for the current weights: candidate thresholds are every
# bucket except the last (empty right side is not a split); polarity
# pol=+1 predicts y=1 on x<=split, pol=-1 the reverse, so
# err(s,-1) = W - err(s,+1). Errors come from cumulative sums over the
# x-ordered cells; the argmin row is picked by a deterministic
# (err, split, pol) rank. Groups whose best stump is perfect (err=0)
# drop out — the logreg det!=0 analogue (alpha would be infinite; the
# planted law's label noise keeps err interior). That drop can ONLY
# happen at round 1, never mid-ensemble: every cell weight is strictly
# positive (products of exp), so a round-t stump with weighted err 0
# classifies EVERY cell correctly and would already have scored err 0
# under round 1's unit weights — i.e. a group that survives round 1
# survives all rounds, and no partial ensemble is ever discarded
# (r10-continuation review asked; err=W is likewise unreachable since
# min(err, W-err) <= W/2 by the polarity pair).
_ADA_BEST_SQL = (
    "SELECT {g}, split, pol, err, w, "
    "       0.5 * ln((w - err) / err) AS alpha "
    "FROM ("
    "  SELECT {g}, split, pol, err, w, "
    "         row_number() OVER (PARTITION BY {g} "
    "                            ORDER BY err, split, pol) AS rk "
    "  FROM ("
    "    SELECT {g}, split, pol, "
    "           CASE WHEN pol = 1 THEN e1 ELSE w - e1 END AS err, w "
    "    FROM ("
    "      SELECT {g}, split, wn_l + (wp_t - wp_l) AS e1, "
    "             wp_t + wn_t AS w, x_max "
    "      FROM ("
    "        SELECT {g}, x AS split, "
    "               sum(wp * pos) OVER (PARTITION BY {g} ORDER BY x "
    "                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT "
    "                   ROW) AS wp_l, "
    "               sum(wn * (cnt - pos)) OVER (PARTITION BY {g} "
    "                   ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING "
    "                   AND CURRENT ROW) AS wn_l, "
    "               sum(wp * pos) OVER (PARTITION BY {g}) AS wp_t, "
    "               sum(wn * (cnt - pos)) OVER (PARTITION BY {g}) "
    "                   AS wn_t, "
    "               max(x) OVER (PARTITION BY {g}) AS x_max "
    "        FROM {src}) "
    "      WHERE split < x_max) "
    "    CROSS JOIN (SELECT CAST(1 AS BIGINT) AS pol "
    "                UNION ALL SELECT CAST(-1 AS BIGINT) AS pol)) "
    ") WHERE rk = 1 AND err > 0 AND err < w")

# weight update: h(x) = pol on x<=split else -pol (y in ±1 form);
# correct instances scale by exp(-alpha), misclassified by exp(+alpha)
# (unnormalized weights — alpha uses the running total W, so
# normalization cancels).
_ADA_REWEIGHT_SQL = (
    "SELECT c.{g}, c.x, c.cnt, c.pos, "
    "       c.wp * CASE WHEN (CASE WHEN c.x <= b.split THEN b.pol "
    "                         ELSE -b.pol END) = 1 "
    "                   THEN exp(-b.alpha) ELSE exp(b.alpha) END AS wp, "
    "       c.wn * CASE WHEN (CASE WHEN c.x <= b.split THEN b.pol "
    "                         ELSE -b.pol END) = -1 "
    "                   THEN exp(-b.alpha) ELSE exp(b.alpha) END AS wn "
    "FROM {cells} c JOIN {best} b ON c.{g} = b.{g}")


def _final_sql(g: str, cells: str, bests: list[str]) -> str:
    """Ensemble summary text over the INITIAL cells and the per-round
    stumps: the T stumps pivoted to fixed columns, the exact 0/1
    training error of sign(Σ alpha_t·h_t(x)) (integer counts — the
    per-cell score is fixed-shape double arithmetic on identical
    alphas, so the sign comparison is exact on both engines), and
    min |score| as the drift-band attestation."""
    t = len(bests)
    joins = " ".join(
        f"JOIN {b} b{i} ON c.{g} = b{i}.{g}"
        for i, b in enumerate(bests, 1))
    fx = " + ".join(
        f"b{i}.alpha * (CASE WHEN c.x <= b{i}.split THEN b{i}.pol "
        f"ELSE -b{i}.pol END)"
        for i in range(1, t + 1))
    stump_cols = ", ".join(
        f"max(split{i}) AS split{i}, max(pol{i}) AS pol{i}, "
        f"round(max(alpha{i}), 5) AS alpha{i}"
        for i in range(1, t + 1))
    stump_inner = ", ".join(
        f"b{i}.split AS split{i}, b{i}.pol AS pol{i}, "
        f"b{i}.alpha AS alpha{i}"
        for i in range(1, t + 1))
    return (
        f"SELECT {g}, CAST(sum(cnt) AS BIGINT) AS n, {stump_cols}, "
        f"       CAST(sum(CASE WHEN fx > 0 THEN cnt - pos ELSE pos END) "
        f"            AS BIGINT) AS n_err, "
        f"       round(CAST(sum(CASE WHEN fx > 0 THEN cnt - pos "
        f"                          ELSE pos END) AS DOUBLE) "
        f"             / sum(cnt), 6) AS train_err, "
        f"       round(min(abs(fx)), 4) AS min_abs_score "
        f"FROM (SELECT c.{g}, c.x, c.cnt, c.pos, {stump_inner}, "
        f"             {fx} AS fx "
        f"      FROM {cells} c {joins}) "
        f"GROUP BY {g}")


def adaboost_fit(spark, xy: DataFrame, group_col: str,
                 rounds: int = 3) -> DataFrame:
    """Per-group discrete AdaBoost with ``rounds`` exhaustive stumps
    over an exact-integer (group, x, y∈{0,1}) frame. Returns one row
    per group: (group, n, split_t/pol_t/alpha_t for each round, n_err,
    train_err, min_abs_score).

    Scale shape: ONE aggregate over the raw frame builds the
    contingency cells; every round after that runs on the bounded
    #groups × #buckets table, pinned on the driver by the kmeans-style
    collect-and-recreate contract (48 rows at 3 groups × 16 buckets —
    NOT data-sized), so the returned plan reads materialized leaves
    (the bpe_merge_steps precedent)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    g = group_col
    xy.createOrReplaceTempView("_ada_xy")
    cells = spark.sql(_ADA_CELLS_SQL.format(g=g, src="_ada_xy"))
    # bounded by contract: #groups × #buckets (the caller quantizes x)
    cells = spark.createDataFrame(cells.collect(), cells.schema)
    cells.createOrReplaceTempView("_ada_c0")
    cells_view = "_ada_c0"
    bests: list[str] = []
    # AQE off for the round loop ONLY (r10 optimization): every frame in
    # it is the driver-pinned contingency table — bounded by CONTRACT at
    # #groups × #buckets rows, never data-sized, at any SF — and AQE's
    # per-stage re-planning turned each tiny window query into 3-4 jobs
    # (23 -> 15 whole-app jobs at rounds=3, values bit-equal). The raw
    # cells aggregate above and the returned final plan execute OUTSIDE
    # this scope with AQE untouched. ASSUMES single-threaded driver use
    # (ADVICE r10): the conf is session-global, so a query planned
    # concurrently on this SparkSession during the loop would silently
    # lose AQE — the harness is single-threaded by construction; scope
    # the override to a cloned session if that ever changes.
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    # With AQE off, every loop shuffle falls back to the session's
    # static spark.sql.shuffle.partitions (= the core count) — 32-way
    # exchanges of a 48-row frame, ~650 whole-app tasks of pure
    # dispatch. The frames are contract-bounded (the SAME argument that
    # justifies the AQE scope, size-invariant at any SF), so pin the
    # loop's shuffles to ONE partition (r11; measured whole-app tasks
    # 652→497 — the rest sit in the data-sized cells aggregate and the
    # AQE-on final plan outside this scope — wall 4.4→3.9-4.2 s at equal
    # weather, values bit-equal, oracle green at 3 SFs). Same
    # single-threaded-session caveat as above.
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        for t in range(1, rounds + 1):
            best = spark.sql(_ADA_BEST_SQL.format(g=g, src=cells_view))
            best = spark.createDataFrame(best.collect(), best.schema)
            bv = f"_ada_b{t}"
            best.createOrReplaceTempView(bv)
            bests.append(bv)
            if t < rounds:
                nxt = spark.sql(_ADA_REWEIGHT_SQL.format(
                    g=g, cells=cells_view, best=bv))
                nxt = spark.createDataFrame(nxt.collect(), nxt.schema)
                cv = f"_ada_c{t}"
                nxt.createOrReplaceTempView(cv)
                cells_view = cv
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
    return spark.sql(_final_sql(g, "_ada_c0", bests))


def adaboost_fit_sql(xy_sql: str, group_col: str, rounds: int = 3) -> str:
    """DuckDB mirror of :func:`adaboost_fit`: the round loop unrolled
    into chained CTEs over the SAME per-stage SQL texts."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    g = group_col
    ctes = [f"xy AS ({xy_sql})",
            "c0 AS (" + _ADA_CELLS_SQL.format(g=g, src="xy") + ")"]
    bests: list[str] = []
    cells = "c0"
    for t in range(1, rounds + 1):
        ctes.append(
            f"b{t} AS (" + _ADA_BEST_SQL.format(g=g, src=cells) + ")")
        bests.append(f"b{t}")
        if t < rounds:
            ctes.append(
                f"c{t} AS (" + _ADA_REWEIGHT_SQL.format(
                    g=g, cells=cells, best=f"b{t}") + ")")
            cells = f"c{t}"
    return ("WITH " + ", ".join(ctes) + " "
            + _final_sql(g, "c0", bests))
