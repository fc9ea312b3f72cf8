"""Unit tests for the batch-14 operators (target encoding, closed-form
OLS, EWMA, mutual information) — hand-computed references on crafted
frames, degenerate-input behavior, and the determinism contracts the
oracle comparison relies on."""

import math

import pytest
from pyspark.sql import Row, functions as F

from datafusion_delta_sharing_spark.operators import corpusstats as CS
from datafusion_delta_sharing_spark.operators import mlprep as ML
from datafusion_delta_sharing_spark.operators import timeseries as TS


# -- target_encode_loo ---------------------------------------------------------

def test_target_encode_loo_hand_computed(spark):
    """LOO + smoothing against a by-hand reference: cat 'a' rows see the
    OTHER a-row's target; the singleton cat 'b' degrades to the smoothed
    global mean exactly."""
    df = spark.createDataFrame(
        [Row(id=1, cat="a", t=100), Row(id=2, cat="a", t=200),
         Row(id=3, cat="b", t=50)])
    out = {r["id"]: r["enc"]
           for r in ML.target_encode_loo(df, "cat", "t", "id",
                                         smoothing=4).collect()}
    g = 350.0 / 3
    # cat a, row 1: (300 - 100 + 4*g) / (2 - 1 + 4)
    assert out[1] == pytest.approx((300 - 100 + 4 * g) / 5, abs=1e-12)
    assert out[2] == pytest.approx((300 - 200 + 4 * g) / 5, abs=1e-12)
    # singleton cat b: (50 - 50 + 4*g) / (1 - 1 + 4) == g
    assert out[3] == pytest.approx(g, abs=1e-12)


def test_target_encode_loo_excludes_own_row(spark):
    """The defining property: a row's own target must NOT contribute.
    With smoothing=0 and a two-row category the encoding IS the other
    row's value."""
    df = spark.createDataFrame(
        [Row(id=1, cat="a", t=10), Row(id=2, cat="a", t=90)])
    out = {r["id"]: r["enc"]
           for r in ML.target_encode_loo(df, "cat", "t", "id",
                                         smoothing=0).collect()}
    assert out[1] == 90.0 and out[2] == 10.0


# -- ols_fit_2f ----------------------------------------------------------------

def _ols_frame(spark, rows):
    return spark.createDataFrame(
        [Row(g="g", x1=a, x2=b, y=c) for a, b, c in rows])


def test_ols_recovers_exact_plane(spark):
    """Points generated from y = 7 + 3*x1 - 2*x2 exactly: the closed
    form must recover the coefficients and r2 = 1."""
    pts = [(x1, x2, 7 + 3 * x1 - 2 * x2)
           for x1 in range(0, 10) for x2 in range(0, 5)]
    row = ML.ols_fit_2f(spark, _ols_frame(spark, pts), "g").collect()[0]
    assert row["n"] == 50
    assert row["b0"] == pytest.approx(7, abs=1e-6)
    assert row["b1"] == pytest.approx(3, abs=1e-6)
    assert row["b2"] == pytest.approx(-2, abs=1e-6)
    assert row["r2"] == pytest.approx(1, abs=1e-6)


def test_ols_matches_numpy_lstsq(spark):
    """Noisy integer data: the Cramer solution equals numpy's least
    squares to rounding."""
    np = pytest.importorskip("numpy")
    rng_rows = [(i % 13, (i * 7) % 11, (3 * (i % 13) - 5 * ((i * 7) % 11)
                                        + (i * i) % 17))
                for i in range(200)]
    row = ML.ols_fit_2f(spark, _ols_frame(spark, rng_rows),
                        "g").collect()[0]
    a = np.array([[1.0, x1, x2] for x1, x2, _ in rng_rows])
    y = np.array([float(v) for _, _, v in rng_rows])
    beta, *_ = np.linalg.lstsq(a, y, rcond=None)
    assert row["b0"] == pytest.approx(beta[0], abs=1e-5)
    assert row["b1"] == pytest.approx(beta[1], abs=1e-5)
    assert row["b2"] == pytest.approx(beta[2], abs=1e-5)


def test_ols_degenerate_constant_feature_yields_null(spark):
    """x2 constant → singular normal matrix (det=0): NULL coefficients,
    not a divide error — the documented degenerate contract."""
    pts = [(x1, 4, 2 * x1) for x1 in range(10)]
    row = ML.ols_fit_2f(spark, _ols_frame(spark, pts), "g").collect()[0]
    assert row["b1"] is None and row["b2"] is None and row["r2"] is None


# -- ewma ----------------------------------------------------------------------

def _ev_frame(spark, vals):
    return spark.createDataFrame(
        [Row(k=1, i=i, ts=i, v=v) for i, v in enumerate(vals)])


def test_ewma_hand_computed(spark):
    """Three observations, alpha=.5 → weights 1, .5, .25 over lags
    0..2: row 3's EWMA = (30 + .5*20 + .25*10) / 1.75."""
    df = _ev_frame(spark, [10, 20, 30])
    out = {r["i"]: (r["ewma"], r["n_obs"])
           for r in TS.ewma(df, "ts", "k", F.col("v"), "i",
                            alpha=0.5, window=4).collect()}
    assert out[0] == (10.0, 1)
    assert out[1][0] == pytest.approx((20 + 0.5 * 10) / 1.5, abs=1e-6)
    assert out[2][0] == pytest.approx((30 + 10 + 2.5) / 1.75, abs=1e-6)
    assert out[2][1] == 3


def test_ewma_window_truncates(spark):
    """window=2 ignores everything older than one lag."""
    df = _ev_frame(spark, [100, 0, 60])
    out = {r["i"]: r["ewma"]
           for r in TS.ewma(df, "ts", "k", F.col("v"), "i",
                            alpha=0.25, window=2).collect()}
    # row 2 sees only v=60 (lag0) and v=0 (lag1): (60 + .75*0) / 1.75
    assert out[2] == pytest.approx(60 / 1.75, abs=1e-6)


def test_ewma_weights_are_exact_dyadics():
    """The determinism contract: repr() of every weight round-trips the
    exact double, so the generated SQL literal is the same number."""
    for w in TS._ewma_weights(0.25, 8):
        assert float(repr(w)) == w


# -- mutual_info_terms ---------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=g) for i, (t, g) in enumerate(rows)])


def test_mutual_info_perfect_association(spark):
    """A token present in every 'en' doc and no 'fr' doc carries exactly
    H(Y) = ln 2 bits of MI when the classes are balanced."""
    docs = _docs(spark, [("apple common", "en"), ("apple common", "en"),
                         ("banane common", "fr"), ("banane common", "fr")])
    out = {r["token"]: r["mi"]
           for r in CS.mutual_info_terms(docs, "text", "doc_id", "lang",
                                         top_m=10).collect()}
    assert out["apple"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["banane"] == pytest.approx(math.log(2), abs=1e-6)
    # a token present in EVERY doc is independent of the label: MI = 0
    assert out["common"] == pytest.approx(0.0, abs=1e-9)


def test_mutual_info_independent_term_is_zero(spark):
    """Presence split evenly across both labels → MI exactly 0."""
    docs = _docs(spark, [("x a", "en"), ("a", "fr"),
                         ("x b", "en"), ("b", "fr")])
    out = {r["token"]: r["mi"]
           for r in CS.mutual_info_terms(docs, "text", "doc_id", "lang",
                                         top_m=10).collect()}
    # 'a' and 'b' each appear in one en and one fr doc — presence is
    # independent of the label, so MI is exactly 0 ('x' is en-only and
    # deliberately not asserted)
    assert out["a"] == pytest.approx(0.0, abs=1e-9)
    assert out["b"] == pytest.approx(0.0, abs=1e-9)


def test_mutual_info_top_m_selection_deterministic(spark):
    """top_m cuts by (df DESC, token ASC): with df ties the
    lexicographically smallest tokens survive."""
    docs = _docs(spark, [("zz aa mm", "en"), ("zz aa mm", "fr")])
    toks = sorted(r["token"] for r in CS.mutual_info_terms(
        docs, "text", "doc_id", "lang", top_m=2).collect())
    assert toks == ["aa", "mm"]
