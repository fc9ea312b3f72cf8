"""Bounded-round Lloyd k-means — the clustering member of the repo's
iterative-algorithm family (connected components, PageRank, BFS,
Bellman-Ford, label propagation, BPE merges).

Reference parity: the reference's relational surface (delegated to
DataFusion, src/lib.rs:16-21) covers the aggregate machinery; the
algorithm is standard Lloyd (1957/1982) with FIXED deterministic
initial centroids and a FIXED round count, which is what makes it
oracle-checkable (random init / run-to-convergence is not).

Determinism contract: points are exact integers; per-round centroids
are single divisions of exact BIGINT sums (bit-identical on both
engines while the sums fit the double mantissa — |Σx| < 2^53, a ~10⁶
margin over sf1 here); the assignment is a per-row fixed-shape
first-index-wins CASE over squared distances built from the SAME IEEE
operation tree on both sides, so every point's cluster is engine-exact.

Scale posture: the assignment is a pure per-row expression — NO
shuffle; each round is one partial+final aggregate producing k rows.
The k-row round result is collected to the driver (bounded by k, the
``similarity.py`` centroid-seed pattern) and re-enters the next round
as literals, so rounds never grow the plan over the raw table. The
classic 100 TB k-means shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dist2(x1, x2, c1: float, c2: float):
    """Squared distance as the fixed IEEE tree
    (x1-c1)*(x1-c1) + (x2-c2)*(x2-c2) — mirrored textually in
    :func:`_assign_case_sql`."""
    d1 = x1 - F.lit(float(c1))
    d2 = x2 - F.lit(float(c2))
    return d1 * d1 + d2 * d2


def _assign(x1, x2, cents: list[tuple[float, float]]):
    """First-index-wins argmin over the k squared distances: cluster j
    wins iff d_j <= d_i for every i > j (ties to the lower index) —
    a per-row expression, no shuffle, same CASE chain as the SQL
    mirror."""
    ds = [_dist2(x1, x2, c1, c2) for c1, c2 in cents]
    expr = F.lit(len(cents) - 1)
    for j in range(len(cents) - 2, -1, -1):
        cond = ds[j] <= ds[j + 1]
        for i in range(j + 2, len(cents)):
            cond = cond & (ds[j] <= ds[i])
        expr = F.when(cond, j).otherwise(expr)
    return expr


def kmeans_fit(points: DataFrame, init: list[tuple[float, float]],
               rounds: int) -> DataFrame:
    """Lloyd k-means over an exact-integer (x1, x2) frame: ``rounds``
    assignment+update iterations from the fixed ``init`` centroids,
    returning the FINAL round's clusters as
    (j, n, c1, c2) — count and the two mean coordinates (one double
    division each). An emptied cluster keeps its previous centroid
    (mirrored by the oracle's coalesce). rounds >= 1; rounds-1 updates
    run eagerly (k-row driver collects), the final assignment+aggregate
    is the returned plan."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cents = [(float(a), float(b)) for a, b in init]
    x1, x2 = F.col("x1"), F.col("x2")
    # ONE pass over the raw rows builds the (x1, x2, cnt) cell table;
    # every Lloyd round aggregates the cells instead of re-scanning the
    # data (r11, guide §2.3 — rounds+1 passes → 1 at any scale; the
    # logreg/adaboost contingency-cell pattern). The assignment depends
    # only on (x1, x2), so it is constant per cell, and every round
    # statistic is an INTEGER sum (sum(x·cnt) == the row-sum exactly) —
    # the cell form is bit-identical to the raw form by construction,
    # not merely within round-off. Lazy checkpoint: the first round's
    # collect materializes it; later rounds and the returned final
    # aggregate reuse the RDD. Cell count is bounded by the distinct
    # quantized coordinate pairs — never larger than the input.
    cells = (points.groupBy("x1", "x2")
             .agg(F.count(F.lit(1)).alias("cnt"))
             .localCheckpoint(eager=False))
    cnt = F.col("cnt")
    for _ in range(rounds - 1):
        sums = (cells.groupBy(_assign(x1, x2, cents).alias("j"))
                .agg(F.sum(cnt).alias("n"),
                     F.sum(x1 * cnt).alias("s1"),
                     F.sum(x2 * cnt).alias("s2"))
                .collect())
        by_j = {r["j"]: r for r in sums}
        cents = [(r["s1"] / r["n"], r["s2"] / r["n"])
                 if (r := by_j.get(j)) else cents[j]
                 for j in range(len(cents))]
    return (cells.groupBy(_assign(x1, x2, cents).alias("j"))
            .agg(F.sum(cnt).alias("n"),
                 F.sum(x1 * cnt).alias("s1"),
                 F.sum(x2 * cnt).alias("s2"))
            .select(F.col("j").cast("int").alias("j"), "n",
                    (F.col("s1").cast("double") / F.col("n"))
                    .alias("c1"),
                    (F.col("s2").cast("double") / F.col("n"))
                    .alias("c2")))


def _assign_case_sql(k: int, c: str) -> str:
    """The oracle's argmin CASE over centroid columns ``{c}{j}1/{c}{j}2``
    of a one-row pivot — the same distance tree and first-index-wins
    chain as :func:`_assign`."""
    if k == 1:
        return "0"  # a WHEN-less CASE does not parse
    ds = [f"((x1 - {c}{j}1) * (x1 - {c}{j}1) "
          f"+ (x2 - {c}{j}2) * (x2 - {c}{j}2))" for j in range(k)]
    lines = []
    for j in range(k - 1):
        cond = " AND ".join(f"{ds[j]} <= {ds[i]}"
                            for i in range(j + 1, k))
        lines.append(f"WHEN {cond} THEN {j}")
    return "CASE " + " ".join(lines) + f" ELSE {k - 1} END"


def kmeans_fit_sql(points_sql: str, init: list[tuple[float, float]],
                   rounds: int) -> str:
    """DuckDB mirror of :func:`kmeans_fit` with the round loop unrolled
    into chained CTEs: m0 is the literal init row, each round
    re-assigns against the previous one-row centroid pivot (a one-row
    CROSS JOIN — what the Spark side does with driver literals) and
    re-aggregates; an empty cluster coalesces to its previous
    centroid. Validates like the Spark twin: rounds < 1 (or an empty
    init) would otherwise emit SQL referencing a nonexistent CTE."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not init:
        raise ValueError("init must name at least one centroid")
    k = len(init)
    m0 = ", ".join(
        f"CAST('{float(a)!r}' AS DOUBLE) AS c{j}1, "
        f"CAST('{float(b)!r}' AS DOUBLE) AS c{j}2"
        for j, (a, b) in enumerate(init))
    ctes = [f"p AS ({points_sql})", f"m0 AS (SELECT {m0})"]
    assign = _assign_case_sql(k, "c")
    for r in range(1, rounds):
        ctes.append(f"""
    g{r} AS (
        SELECT {assign} AS j, count(*) AS n,
               CAST(sum(x1) AS BIGINT) AS s1,
               CAST(sum(x2) AS BIGINT) AS s2
        FROM p CROSS JOIN m{r - 1} GROUP BY 1
    )""")
        cols = ", ".join(
            f"coalesce(MAX(CASE WHEN j = {j} THEN CAST(s1 AS DOUBLE) / n"
            f" END), (SELECT c{j}1 FROM m{r - 1})) AS c{j}1, "
            f"coalesce(MAX(CASE WHEN j = {j} THEN CAST(s2 AS DOUBLE) / n"
            f" END), (SELECT c{j}2 FROM m{r - 1})) AS c{j}2"
            for j in range(k))
        ctes.append(f"m{r} AS (SELECT {cols} FROM g{r})")
    return f"""
        WITH {','.join(ctes)}
        SELECT CAST(j AS INT) AS j, CAST(n AS BIGINT) AS n,
               CAST(s1 AS DOUBLE) / n AS c1,
               CAST(s2 AS DOUBLE) / n AS c2
        FROM (
            SELECT {assign} AS j, count(*) AS n,
                   CAST(sum(x1) AS BIGINT) AS s1,
                   CAST(sum(x2) AS BIGINT) AS s2
            FROM p CROSS JOIN m{rounds - 1} GROUP BY 1
        )
    """
