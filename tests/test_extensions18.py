"""Unit tests for the batch-18 operators (Lloyd k-means, k-core
peeling, seasonal decomposition, CUSUM changepoint): hand-computed
references, fixpoint/degenerate behavior, and the determinism
contracts the registry queries rely on."""

import pytest
from pyspark.sql import Row

from datafusion_delta_sharing_spark.operators import clustering as CL
from datafusion_delta_sharing_spark.operators import graph as G
from datafusion_delta_sharing_spark.operators import timeseries as TS


# -- k-means -------------------------------------------------------------------

def _pts(spark, pairs):
    return spark.createDataFrame(
        [Row(x1=a, x2=b) for a, b in pairs], "x1 bigint, x2 bigint")


def test_kmeans_two_obvious_clusters(spark):
    """Two tight blobs, two rounds: centroids land on the blob means
    exactly (integer sums, one division)."""
    pts = _pts(spark, [(0, 0), (2, 0), (0, 2), (2, 2),
                       (100, 100), (102, 100), (100, 102), (102, 102)])
    out = {r["j"]: r for r in
           CL.kmeans_fit(pts, [(10.0, 10.0), (90.0, 90.0)],
                         rounds=2).collect()}
    assert out[0]["n"] == 4 and (out[0]["c1"], out[0]["c2"]) == (1.0, 1.0)
    assert out[1]["n"] == 4 and (out[1]["c1"],
                                 out[1]["c2"]) == (101.0, 101.0)


def test_kmeans_tie_goes_to_lower_index(spark):
    """A point equidistant from two centroids joins the lower j —
    the first-index-wins CASE chain, mirrored by the oracle."""
    pts = _pts(spark, [(5, 5)])
    out = CL.kmeans_fit(pts, [(0.0, 0.0), (10.0, 10.0)],
                        rounds=1).collect()
    assert [r["j"] for r in out] == [0]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A centroid that attracts nothing keeps its coordinates through
    the update (no 0/0), so the final assignment still sees k
    centroids."""
    pts = _pts(spark, [(0, 0), (1, 1)])
    out = CL.kmeans_fit(pts, [(0.0, 0.0), (500.0, 500.0)],
                        rounds=3).collect()
    assert {r["j"] for r in out} == {0}  # far centroid stays empty


def test_kmeans_rejects_zero_rounds(spark):
    """Both twins validate (r8 review: the SQL mirror used to emit a
    reference to the nonexistent CTE m-1, and k=1 a WHEN-less CASE)."""
    with pytest.raises(ValueError, match="rounds"):
        CL.kmeans_fit(_pts(spark, [(0, 0)]), [(0.0, 0.0)], rounds=0)
    with pytest.raises(ValueError, match="rounds"):
        CL.kmeans_fit_sql("SELECT 1 AS x1, 1 AS x2", [(0.0, 0.0)], 0)
    import duckdb
    one = CL.kmeans_fit_sql("SELECT 1 AS x1, 2 AS x2", [(0.0, 0.0)], 1)
    assert duckdb.sql(one).fetchall() == [(0, 1, 1.0, 2.0)]  # k=1 parses


# -- k-core --------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(a=a, b=b) for a, b in pairs], "a bigint, b bigint")


def test_kcore_peels_tail_and_reaches_fixpoint(spark):
    """K4 (every vertex degree 3) plus a pendant chain: the 3-core is
    exactly the K4 — the chain peels off over two rounds and the
    fixpoint flag confirms the budget sufficed."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    out = G.kcore(_edges(spark, k4 + chain), k=3,
                  max_rounds=3).collect()[0]
    assert (out["n_core_vertices"], out["n_core_edges"]) == (4, 6)
    assert out["fixpoint_reached"]


def test_kcore_sql_rejects_zero_rounds(spark):
    """The SQL mirror validates like the Spark twin (r8 review: it
    used to emit a reference to the nonexistent CTE e-1)."""
    with pytest.raises(ValueError, match="rounds"):
        G.kcore_sql("SELECT 1 AS a, 2 AS b", 2, 0)


def test_kcore_insufficient_rounds_is_visible(spark):
    """A peel cascade longer than the round budget leaves
    fixpoint_reached False — the budget shortfall is in the result,
    never silent. Chain 1-2-3-4-5 under k=2 peels one endpoint layer
    per round and needs 2 rounds to empty; 1 round is not stable."""
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    out = G.kcore(_edges(spark, chain), k=2, max_rounds=1).collect()[0]
    assert not out["fixpoint_reached"]
    out = G.kcore(_edges(spark, chain), k=2, max_rounds=3).collect()[0]
    assert (out["n_core_vertices"], out["n_core_edges"]) == (0, 0)
    assert out["fixpoint_reached"]


# -- seasonal decomposition -------------------------------------------------------

def _series(spark, xs, days=None):
    days = days if days is not None else range(len(xs))
    return spark.createDataFrame(
        [Row(day=d, x=x) for d, x in zip(days, xs)],
        "day bigint, x bigint")


def test_seasonal_pure_cycle_decomposes_exactly(spark):
    """x = perfect period-3 cycle [3, 6, 9]*5 : trend = 6 everywhere a
    full window exists, seasonal = dow-mean of the detrended series,
    residual exactly 0 on full-window days."""
    out = {r["day"]: r for r in
           TS.seasonal_decompose(spark, _series(spark, [3, 6, 9] * 5),
                                 "day", "x", period=3).collect()}
    assert len(out) == 15
    for d in range(1, 14):  # full centered windows
        assert out[d]["trend"] == 6.0
        assert out[d]["resid"] == 0.0
    assert out[0]["trend"] is None and out[14]["resid"] is None
    assert out[3]["seasonal"] == -3.0  # dow 0 carries x=3 → 3−6
    assert out[5]["seasonal"] == 3.0


def test_seasonal_gap_shrinks_window_to_null(spark):
    """A calendar gap makes the centered RANGE window incomplete —
    trend/resid NULL there (classical estimator undefined), seasonal
    still defined from the remaining full windows."""
    xs, days = [3, 6, 9, 3, 6, 9, 3], [0, 1, 2, 3, 4, 5, 7]
    out = {r["day"]: r for r in
           TS.seasonal_decompose(spark, _series(spark, xs, days),
                                 "day", "x", period=3).collect()}
    assert out[5]["trend"] is None  # day 6 missing from its window
    assert out[2]["trend"] == 6.0


def test_seasonal_rejects_even_period(spark):
    with pytest.raises(ValueError, match="odd"):
        TS.seasonal_decompose(spark, _series(spark, [1, 2]), "day",
                              "x", period=4)
    with pytest.raises(ValueError, match="odd"):
        TS.seasonal_decompose_sql("SELECT 1 AS day, 1 AS x", "day",
                                  "x", 4)


def test_seasonal_unestimable_dow_class_stays_null(spark):
    """A day whose day%period class has NO full-window representative
    still emits its row, with NULL seasonal (r8 review: the earlier
    inner join dropped it): 4 days, period 3 — dow 0 (days 0 and 3)
    never owns a full centered window."""
    out = {r["day"]: r for r in
           TS.seasonal_decompose(spark, _series(spark, [5, 8, 2, 9]),
                                 "day", "x", period=3).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    for d in (0, 3):
        assert out[d]["seasonal"] is None and out[d]["trend"] is None
    assert out[1]["seasonal"] is not None


# -- CUSUM ------------------------------------------------------------------------

def test_cusum_level_shift_peaks_at_boundary(spark):
    """x = 5 for days 0..9 then 15 for days 10..19: n·S_t is most
    negative exactly at day 9 (the last pre-shift day) and that row is
    flagged; values are hand-checkable: n=20, Σx=200, at t=10 (day 9)
    cum=50 → nS = 20·50 − 10·200 = −1000."""
    out = {r["day"]: r for r in
           TS.cusum_deviation(spark,
                              _series(spark, [5] * 10 + [15] * 10),
                              "day", "x").collect()}
    assert out[9]["ns_t"] == -1000
    peaks = [d for d, r in out.items() if r["is_peak"]]
    assert peaks == [9]


def test_cusum_constant_series_all_zero(spark):
    """No shift → every deviation is exactly 0 and every row ties for
    the peak (|0| = max |0|) — degenerate but well-defined."""
    out = TS.cusum_deviation(spark, _series(spark, [7] * 5), "day",
                             "x").collect()
    assert all(r["ns_t"] == 0 and r["is_peak"] for r in out)
