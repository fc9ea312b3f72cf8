"""Extensions batch 18 (r8 session, r10 window slots — WINDOW_PLAN.json
r10_new): clustering, graph-core, and time-series structure — the
second r8-session capability wave, deliberately seated in the ROUND-
AFTER-NEXT window so each round's new-capability batch stays at the
~15 cap VERDICT r7 #1 set.

* ``kmeans_fit`` — bounded-round Lloyd k-means
  (:func:`..operators.clustering.kmeans_fit`): fixed deterministic
  init, per-row argmin assignment (no shuffle), one k-row aggregate
  per round; the oracle unrolls the loop into CTEs.
* ``kcore`` — k-core peeling (:func:`..operators.graph.kcore`) with an
  IN-PLAN fixpoint attestation — the degeneracy-layer complement of
  the triangle/component/community family.
* ``seasonal_decompose`` — classical additive trend/seasonal/residual
  (:func:`..operators.timeseries.seasonal_decompose`): RANGE-framed
  centered MA + exact scaled-integer seasonal means.
* ``cusum_changepoint`` — Page's cumulative-deviation changepoint
  statistic (:func:`..operators.timeseries.cusum_deviation`), exact
  integers end-to-end, with an injected level shift the peak flag must
  locate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import (
    extensions17 as E17, load_table)
from datafusion_delta_sharing_spark.operators import clustering as CL
from datafusion_delta_sharing_spark.operators import graph as G
from datafusion_delta_sharing_spark.operators import timeseries as TS

# -- k-means ---------------------------------------------------------------------

# features: (quantity 1..50, discount per-mille 0..100) — both exact
# integers; four corner seeds; 3 rounds (2 updates + the returned
# assignment round)
_KM_INIT = [(10.0, 20.0), (40.0, 20.0), (10.0, 80.0), (40.0, 80.0)]
_KM_ROUNDS = 3

_KM_POINTS_SQL = ("SELECT CAST(floor(l_quantity) AS BIGINT) AS x1, "
                  "CAST(round(l_discount * 1000) AS BIGINT) AS x2 "
                  "FROM lineitem")


def q_kmeans_fit(spark, sf_dir):
    """Lloyd k-means (k=4, 3 rounds) over (quantity, discount) —
    per-row assignment (zero-shuffle), k-row aggregate per round,
    driver state bounded by k (the similarity.py seed pattern). Sum
    headroom vs the 2^53 double mantissa is ~10⁶ at sf1 (Σx1 ≈ 1.5e8).
    floor() spelled explicitly: Spark CAST(double AS BIGINT) truncates
    while DuckDB rounds (the ols_fit note)."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.floor(F.col("l_quantity")).cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 1000).cast("bigint").alias("x2"))
    return CL.kmeans_fit(pts, _KM_INIT, _KM_ROUNDS)


# -- k-core ----------------------------------------------------------------------

# the triangles-family co-occurrence graph: parts co-ordered within an
# order, pinned subgraph for the same degeneracy reason as
# bfs_hops/shortest_paths (the synthetic graph is near-complete at full
# size — see extensions11 notes); k=3, 4 peel rounds with the in-plan
# fixpoint flag attesting the budget sufficed
_KC_K, _KC_ROUNDS, _KC_PIN = 3, 4, 2000

_KC_EDGES_SQL = f"""
    SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                    greatest(a.l_partkey, b.l_partkey) AS b
    FROM (SELECT l_orderkey, l_partkey FROM lineitem
          WHERE l_orderkey < {_KC_PIN}) a
    JOIN (SELECT l_orderkey, l_partkey FROM lineitem
          WHERE l_orderkey < {_KC_PIN}) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def q_kcore(spark, sf_dir):
    """3-core of the pinned part co-occurrence graph after 4
    synchronous peel rounds: summary (n_core_vertices, n_core_edges,
    fixpoint_reached) — the flag is computed IN-PLAN from the last two
    rounds, so an insufficient round budget is visible in the driver
    row, never silent."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < _KC_PIN))
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return G.kcore(edges, _KC_K, _KC_ROUNDS)


# -- seasonal decomposition ---------------------------------------------------------

_SD_PERIOD = 7


def q_seasonal_decompose(spark, sf_dir):
    """Classical additive decomposition (period 7) of the weekly-
    modulated daily order count: the injected (1 + day%7) cycle must
    land in the seasonal component, leaving the residual small. Edge
    days (incomplete centered window) carry NULL trend/resid by the
    classical definition."""
    return TS.seasonal_decompose(
        spark, E17.weekly_order_series(spark, sf_dir), "day", "x",
        _SD_PERIOD)


# -- CUSUM changepoint ---------------------------------------------------------------

_SD_EPOCH = E17._ACF_EPOCH
_CU_SHIFT_DAY, _CU_SHIFT = 1200, 200


def q_cusum_changepoint(spark, sf_dir):
    """Page's CUSUM deviation over the daily order count with an
    injected +200 level shift from day 1200: |nS_t| must peak AT the
    shift boundary (the flagged row), exact integers end-to-end. At
    sf0.01 the natural series is ~6/day, so the shift dominates and
    the peak day is stable across SFs."""
    day = F.datediff(F.col("o_orderdate"), F.lit(_SD_EPOCH))
    series = (load_table(spark, sf_dir, "orders")
              .groupBy(day.cast("bigint").alias("day"))
              .agg(F.count(F.lit(1)).alias("cnt"))
              .select("day",
                      (F.col("cnt")
                       + F.when(F.col("day") >= _CU_SHIFT_DAY,
                                _CU_SHIFT).otherwise(0))
                      .cast("bigint").alias("x")))
    return TS.cusum_deviation(spark, series, "day", "x")


_CU_SERIES_SQL = f"""
    SELECT day, CAST(cnt + CASE WHEN day >= {_CU_SHIFT_DAY}
                               THEN {_CU_SHIFT} ELSE 0 END AS BIGINT)
               AS x
    FROM (
        SELECT CAST(date_diff('day', DATE '{_SD_EPOCH}',
                              CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS day,
               count(*) AS cnt
        FROM orders GROUP BY 1
    )
"""


QUERIES = {
    "kmeans_fit": q_kmeans_fit,
    "kcore": q_kcore,
    "seasonal_decompose": q_seasonal_decompose,
    "cusum_changepoint": q_cusum_changepoint,
}

ORACLES = {
    "kmeans_fit": CL.kmeans_fit_sql(_KM_POINTS_SQL, _KM_INIT,
                                    _KM_ROUNDS),
    "kcore": G.kcore_sql(_KC_EDGES_SQL, _KC_K, _KC_ROUNDS),
    "seasonal_decompose": TS.seasonal_decompose_sql(
        E17._ACF_SERIES_SQL, "day", "x", _SD_PERIOD),
    "cusum_changepoint": TS.cusum_deviation_sql(_CU_SERIES_SQL, "day",
                                                "x"),
}
