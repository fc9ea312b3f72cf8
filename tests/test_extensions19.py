"""Unit + property tests for the batch-19 operators (A/B statistics,
gains/lift): hand-computed references, degenerate-arm guards, and
DuckDB-vs-pure-Python property checks (no Spark in those)."""

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from datafusion_delta_sharing_spark.operators import abtest as AB
from datafusion_delta_sharing_spark.operators import evalmetrics as EM


def _rows(spark, triples):
    return spark.createDataFrame(
        [Row(arm=a, conv=c, v=v) for a, c, v in triples],
        "arm string, conv int, v bigint")


# -- A/B hand-computed --------------------------------------------------------

def test_ab_hand_computed(spark):
    """A: conv (1,0), v (10, 20); B: conv (1,1), v (10, 30):
    rates .5 vs 1, pooled .75, z = -.5/sqrt(.75*.25*1) ≈ -1.1547;
    means 15 vs 20, var_a = 50, var_b = 200, t = -5/sqrt(125)."""
    out = AB.ab_summary(spark, _rows(spark, [
        ("A", 1, 10), ("A", 0, 20), ("B", 1, 10), ("B", 1, 30),
    ])).collect()[0]
    assert (out["n_a"], out["n_b"]) == (2, 2)
    assert out["rate_a"] == 0.5 and out["rate_b"] == 1.0
    assert out["z_prop"] == pytest.approx(
        -0.5 / math.sqrt(0.75 * 0.25 * 1.0), abs=1e-12)
    assert out["t_welch"] == pytest.approx(-5 / math.sqrt(125),
                                           abs=1e-12)
    # Welch-Satterthwaite: se2=125, num=125^2, den=25^2/1+100^2/1
    assert out["df_welch"] == pytest.approx(125 ** 2 / (625 + 10000),
                                            abs=1e-9)


def test_ab_degenerate_arms_are_null(spark):
    """Full conversion on both arms (pooled = 1) and single-row arms
    (n < 2) yield NULL statistics, never a divide error."""
    out = AB.ab_summary(spark, _rows(spark, [
        ("A", 1, 5), ("B", 1, 7),
    ])).collect()[0]
    assert out["z_prop"] is None and out["t_welch"] is None
    assert out["df_welch"] is None


def test_ab_third_arm_surfaces_not_drops(spark):
    """ADVICE r8: an arm outside {'A','B'} must not vanish into a
    plausible two-arm summary — n_other_arms reports exactly how many
    rows the pivot excluded, and 0 on contract-clean input."""
    out = AB.ab_summary(spark, _rows(spark, [
        ("A", 1, 10), ("A", 0, 20), ("B", 1, 10), ("B", 1, 30),
        ("C", 1, 99), ("c", 0, 99), ("", 0, 99),
        (None, 1, 99),  # NULL NOT IN (..) is NULL, not true — the
        (None, 0, 99),  # unassigned-arm rows need their own predicate
    ])).collect()[0]
    assert out["n_other_arms"] == 5
    assert (out["n_a"], out["n_b"]) == (2, 2)
    clean = AB.ab_summary(spark, _rows(spark, [
        ("A", 1, 10), ("B", 1, 30),
    ])).collect()[0]
    assert clean["n_other_arms"] == 0


def test_ab_zero_variance_is_null(spark):
    """Constant value metric on both arms → se² = 0 → NULL t/df."""
    out = AB.ab_summary(spark, _rows(spark, [
        ("A", 1, 5), ("A", 0, 5), ("B", 0, 5), ("B", 1, 5),
    ])).collect()[0]
    assert out["t_welch"] is None and out["df_welch"] is None
    assert out["z_prop"] == 0.0


# -- gains/lift hand-computed ---------------------------------------------------

def test_gains_hand_computed(spark):
    """Two bins: top bin 2 rows 2 pos, bottom 2 rows 0 pos → top gain
    1.0 at half the population → lift exactly 2; full population lift
    exactly 1."""
    df = spark.createDataFrame(
        [Row(bin=1, label=1), Row(bin=1, label=1),
         Row(bin=0, label=0), Row(bin=0, label=0)],
        "bin int, label int")
    out = {r["bin"]: r for r in EM.gains_lift(spark, df).collect()}
    assert out[1]["gain"] == 1.0 and out[1]["lift"] == 2.0
    assert out[0]["gain"] == 1.0 and out[0]["lift"] == 1.0


def test_gains_no_positives_is_null(spark):
    df = spark.createDataFrame([Row(bin=0, label=0)],
                               "bin int, label int")
    out = EM.gains_lift(spark, df).collect()[0]
    assert out["gain"] is None and out["lift"] is None


# -- property: oracle mirrors vs pure Python -------------------------------------

def _duck(views, sql):
    con = duckdb.connect()
    for name, pdf in views.items():
        con.register(name, pdf)
    return con.execute(sql).fetchdf()


_ab_rows = st.lists(
    st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 1),
              st.integers(-50, 50)),
    min_size=2, max_size=40).filter(
        lambda rs: {a for a, _, _ in rs} == {"A", "B"})


@settings(max_examples=100, deadline=None)
@given(_ab_rows)
def test_ab_oracle_matches_python_reference(rows):
    views = {"t": pd.DataFrame(rows, columns=["arm", "conv", "v"])}
    got = _duck(views, AB.ab_summary_sql(
        "SELECT arm, conv, v FROM t")).iloc[0]

    def stats(a):
        g = [(c, v) for arm, c, v in rows if arm == a]
        n = len(g)
        sc = sum(c for c, _ in g)
        sv = sum(v for _, v in g)
        svv = sum(v * v for _, v in g)
        return n, sc, sv, svv

    (na, sca, sva, svva), (nb, scb, svb, svvb) = stats("A"), stats("B")
    assert (got["n_a"], got["n_b"]) == (na, nb)
    rate_a, rate_b = sca / na, scb / nb
    pooled = (sca + scb) / (na + nb)
    assert got["rate_a"] == rate_a and got["rate_b"] == rate_b
    if pooled in (0.0, 1.0):
        assert pd.isna(got["z_prop"])
    else:
        z = ((rate_a - rate_b)
             / math.sqrt(pooled * (1.0 - pooled) * (1 / na + 1 / nb)))
        assert got["z_prop"] == pytest.approx(z, abs=1e-12)
    if na >= 2 and nb >= 2:
        va = (na * svva - sva * sva) / (na * (na - 1))
        vb = (nb * svvb - svb * svb) / (nb * (nb - 1))
        se2 = va / na + vb / nb
        if se2 > 0:
            t = (sva / na - svb / nb) / math.sqrt(se2)
            assert got["t_welch"] == pytest.approx(t, abs=1e-10)
        else:
            assert pd.isna(got["t_welch"])
    else:
        assert pd.isna(got["t_welch"])


_gains_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 1)),
    min_size=1, max_size=40)


@settings(max_examples=100, deadline=None)
@given(_gains_rows)
def test_gains_oracle_matches_python_reference(rows):
    views = {"t": pd.DataFrame(rows, columns=["bin", "label"])}
    got = _duck(views, EM.gains_lift_sql("SELECT bin, label FROM t"))
    tot_n, tot_pos = len(rows), sum(lb for _, lb in rows)
    bins = sorted({b for b, _ in rows}, reverse=True)
    cum_n = cum_pos = 0
    ref = {}
    for b in bins:
        grp = [lb for bb, lb in rows if bb == b]
        cum_n += len(grp)
        cum_pos += sum(grp)
        ref[b] = (len(grp), sum(grp), cum_n, cum_pos)
    assert len(got) == len(bins)
    for _, r in got.iterrows():
        n, n_pos, cn, cp = ref[int(r["bin"])]
        assert (r["n"], r["n_pos"], r["cum_n"], r["cum_pos"]) == (
            n, n_pos, cn, cp)
        if tot_pos == 0:
            assert pd.isna(r["gain"]) and pd.isna(r["lift"])
        else:
            assert r["gain"] == cp / tot_pos
            assert r["lift"] == (cp / tot_pos) / (cn / tot_n)
