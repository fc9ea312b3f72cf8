"""Unit tests for the batch-17 operators (Fellegi–Sunter scoring,
count-min sketch, autocorrelation): hand-computed references, the CM
guarantees' non-vacuousness, mergeability, and the ACF identities."""

import pytest
from pyspark.sql import Row, functions as F

from datafusion_delta_sharing_spark.operators import linkage as LK
from datafusion_delta_sharing_spark.operators import sketches as SK
from datafusion_delta_sharing_spark.operators import timeseries as TS


# -- Fellegi-Sunter ----------------------------------------------------------

_M, _U = (0.9, 0.8), (0.1, 0.2)
# weights: agree (3.1699.., 2.0), disagree (-3.1699.., -2.0)


def _pairs(spark, rows):
    return spark.createDataFrame(
        [Row(ag_a=a, ag_b=b, is_true=t) for a, b, t in rows],
        "ag_a boolean, ag_b boolean, is_true boolean")


def _summary(spark, rows, lower=-1.0, upper=4.0):
    out = LK.fs_decisions(spark, _pairs(spark, rows), ("ag_a", "ag_b"),
                          _M, _U, lower, upper).collect()
    return {(r["decision"], r["is_true"]): r["n"] for r in out}


def test_fs_thresholds_hand_computed(spark):
    """both agree → 5.17 match; both off → −5.17 nonmatch; a-only →
    1.17 review (between the −1/4 thresholds)."""
    got = _summary(spark, [(True, True, True), (False, False, False),
                           (True, False, True)])
    assert got == {("match", True): 1, ("nonmatch", False): 1,
                   ("review", True): 1}


def test_fs_null_agreement_counts_against(spark):
    """A NULL agreement (missing field) takes the disagreement weight:
    (NULL, True) → −3.17 + 2.0 = −1.17 ≤ lower → nonmatch."""
    got = _summary(spark, [(None, True, False)])
    assert got == {("nonmatch", False): 1}


def test_fs_degenerate_probabilities_fail_loudly(spark):
    """ADVICE r8: u=0, m=1, u>=m, or a length mismatch must raise an
    explicit ValueError naming the culprit column at SQL-build time,
    not a bare ZeroDivisionError from log2."""
    pairs = _pairs(spark, [(True, True, True)])
    for m, u in (((0.9, 0.8), (0.0, 0.2)),   # u = 0 → log2(m/0)
                 ((1.0, 0.8), (0.1, 0.2)),   # m = 1 → log2(0/(1-u))
                 ((0.9, 0.8), (0.1, 1.0)),   # u = 1
                 ((0.2, 0.8), (0.3, 0.2))):  # u > m inverts the weight
        with pytest.raises(ValueError, match="0 < u < m < 1"):
            LK.fs_decisions(spark, pairs, ("ag_a", "ag_b"),
                            m, u, -1.0, 4.0)
    with pytest.raises(ValueError, match="one probability per"):
        LK.fs_decisions(spark, pairs, ("ag_a", "ag_b"),
                        (0.9,), (0.1, 0.2), -1.0, 4.0)


def test_fs_boundary_is_inclusive(spark):
    """score == upper classifies as match (>=), score == lower as
    nonmatch (<=): with thresholds set exactly at the two-field scores
    the review band is empty."""
    score_all = 3.169925001442312 + 2.0
    got = LK.fs_decisions(
        spark, _pairs(spark, [(True, True, True)]), ("ag_a", "ag_b"),
        _M, _U, score_all, score_all).collect()
    assert got[0]["decision"] == "match"


# -- count-min ---------------------------------------------------------------

def _keys(spark, counts):
    rows = [Row(k=k) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows)


def test_cm_exact_when_wide(spark):
    """Width >> distinct keys → no collisions is overwhelmingly likely
    with this fixed hash family (verified by construction here): every
    estimate equals the true count and both attestations hold."""
    counts = {1: 5, 2: 3, 3: 9}
    raw = _keys(spark, counts)
    sk = SK.cm_sketch(raw, "k", depth=4, width=8192)
    out = SK.cm_probe(spark, sk, raw, "k", [1, 2, 3], 4, 8192).collect()
    for r in out:
        assert r["n_est"] == counts[r["k"]] == r["n_true"]
        assert r["ge_ok"] and r["bound_ok"]


def test_cm_never_undercounts_when_narrow(spark):
    """Width 2 forces collisions: estimates may exceed truth but NEVER
    fall below it, and the 3N/w bound still holds — and the overcount
    branch is actually exercised (some est > true), so bound_ok is
    non-vacuous."""
    counts = {k: k + 1 for k in range(20)}
    raw = _keys(spark, counts)
    sk = SK.cm_sketch(raw, "k", depth=2, width=2)
    out = SK.cm_probe(spark, sk, raw, "k", list(range(20)), 2,
                      2).collect()
    assert all(r["ge_ok"] and r["bound_ok"] for r in out)
    assert any(r["n_est"] > r["n_true"] for r in out)


def test_cm_absent_key_estimate_is_pure_collision(spark):
    """A key never inserted gets est >= 0 from colliding mass only;
    ge_ok still holds with n_true = 0."""
    raw = _keys(spark, {1: 4})
    sk = SK.cm_sketch(raw, "k", depth=4, width=4096)
    out = SK.cm_probe(spark, sk, raw, "k", [999], 4, 4096).collect()[0]
    assert out["n_true"] == 0 and out["ge_ok"]


def test_cm_sketch_merges_by_summing(spark):
    """THE mergeability property: sketch(A ∪ B) == per-(d,bucket) sum
    of sketch(A) and sketch(B)."""
    a, b = _keys(spark, {1: 3, 2: 2}), _keys(spark, {2: 4, 7: 1})
    direct = SK.cm_sketch(a.unionByName(b), "k", 3, 64)
    merged = (SK.cm_sketch(a, "k", 3, 64)
              .unionByName(SK.cm_sketch(b, "k", 3, 64))
              .groupBy("d", "bucket").agg(F.sum("c").alias("c")))
    assert (sorted(map(tuple, direct.collect()))
            == sorted(map(tuple, merged.collect())))


# -- ACF ----------------------------------------------------------------------

def _series(spark, xs, days=None):
    days = days if days is not None else range(len(xs))
    return spark.createDataFrame(
        [Row(day=d, x=x) for d, x in zip(days, xs)])


def test_acf_lag0_is_exactly_one(spark):
    out = {r["lag"]: r for r in
           TS.acf(spark, _series(spark, [5, 9, 2, 7]), "day", "x",
                  2).collect()}
    assert out[0]["acf"] == 1.0 and out[0]["m_pairs"] == 4


def test_acf_periodic_series_hand_computed(spark):
    """x = [1,2,3]*4 (n=12): deviations repeat every 3, so
    acf(3) = (k−1)/k = 0.75 exactly under the pairs-available
    estimator; the alternating series [1,3]*2 gives acf(1) = −0.75."""
    out = {r["lag"]: r["acf"] for r in
           TS.acf(spark, _series(spark, [1, 2, 3] * 4), "day", "x",
                  3).collect()}
    assert out[3] == 0.75
    out = {r["lag"]: r["acf"] for r in
           TS.acf(spark, _series(spark, [1, 3, 1, 3]), "day", "x",
                  1).collect()}
    assert out[1] == -0.75


def test_acf_calendar_gaps_drop_pairs_only(spark):
    """A missing day removes exactly the pairs that would span it —
    day arithmetic, not row offsets: days (0,1,3) at lag 1 pair only
    (0,1); a row-offset lead would wrongly pair (1,3)."""
    out = {r["lag"]: r for r in
           TS.acf(spark, _series(spark, [4, 6, 8], days=[0, 1, 3]),
                  "day", "x", 1).collect()}
    assert out[1]["m_pairs"] == 1


def test_acf_zero_pair_lag_emits_null_row(spark):
    """A lag no day-pair spans still emits its row — (lag, 0, NULL) —
    instead of silently vanishing from the output (r8 review): days
    (0, 5) at max_lag 2 have no pairs at lags 1 or 2."""
    out = {r["lag"]: r for r in
           TS.acf(spark, _series(spark, [4, 6], days=[0, 5]),
                  "day", "x", 2).collect()}
    assert sorted(out) == [0, 1, 2]
    for lag in (1, 2):
        assert out[lag]["m_pairs"] == 0 and out[lag]["acf"] is None


def test_cm_depth_bounded_by_digest(spark):
    """depth > 4 cannot slice one 32-hex md5 — rejected loudly."""
    raw = _keys(spark, {1: 2})
    with pytest.raises(ValueError, match="depth"):
        SK.cm_sketch(raw, "k", depth=5, width=8)


def test_acf_constant_series_is_null(spark):
    """Zero variance → NULL (0/0 guarded), not an error."""
    out = TS.acf(spark, _series(spark, [5, 5, 5]), "day", "x",
                 1).collect()
    assert all(r["acf"] is None for r in out)
