"""Hypothesis property tests for the r8-session batch 16/17 operators:
each DuckDB oracle mirror (proven equal to the Spark plan by
compare_oracle at sf0.01 + sf0.1) is checked against an independent
pure-Python reference on fuzzer-chosen inputs — closing the 'both
engines share the same misspelled formula' hole (the
test_r7/r8_properties pattern). No Spark session."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_delta_sharing_spark.operators.evalmetrics import (
    auc_roc_sql, calibration_bins_sql, ndcg_at_k_sql, rrf_fuse_sql)
from datafusion_delta_sharing_spark.operators.linkage import (
    fs_decisions_sql)
from datafusion_delta_sharing_spark.operators.sketches import (
    cm_probe_sql)
from datafusion_delta_sharing_spark.operators.timeseries import acf_sql


def _duck(views: dict[str, pd.DataFrame], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, pdf in views.items():
        con.register(name, pdf)
    return con.execute(sql).fetchdf()


# -- AUC ------------------------------------------------------------------------

_scored = st.lists(
    st.tuples(st.integers(0, 1), st.integers(-5, 5)),
    min_size=1, max_size=40)


@settings(max_examples=120, deadline=None)
@given(_scored)
def test_auc_oracle_matches_pairwise_reference(rows):
    """Rank-sum AUC == the O(n²) pairwise definition (wins + half
    ties), bit-exactly: the SQL numerator s2p − n⁺(n⁺+1) equals twice
    the Mann-Whitney U, an integer, and both sides then perform the
    identical double division."""
    views = {"t": pd.DataFrame(rows, columns=["label", "s"])}
    got = _duck(views, auc_roc_sql(
        "SELECT 'g' AS g, label, s FROM t", "g")).iloc[0]
    pos = [s for lb, s in rows if lb == 1]
    neg = [s for lb, s in rows if lb == 0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    if not pos or not neg:
        assert pd.isna(got["auc"])
        return
    wins2 = sum((2 if p > n else 1 if p == n else 0)
                for p in pos for n in neg)
    assert got["auc"] == wins2 / (2.0 * len(pos) * len(neg))


# -- calibration ------------------------------------------------------------------

_binned = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1), st.integers(0, 99)),
    min_size=1, max_size=40)


@settings(max_examples=100, deadline=None)
@given(_binned)
def test_calibration_oracle_matches_reference(rows):
    views = {"t": pd.DataFrame(rows, columns=["bin", "label", "s"])}
    got = _duck(views, calibration_bins_sql(
        "SELECT bin, label, s FROM t", 100))
    by_bin = {int(r["bin"]): r for _, r in got.iterrows()}
    for b in {r[0] for r in rows}:
        grp = [(lb, s) for bb, lb, s in rows if bb == b]
        n = len(grp)
        n_pos = sum(lb for lb, _ in grp)
        s_sum = sum(s for _, s in grp)
        r = by_bin[b]
        assert r["n"] == n and r["n_pos"] == n_pos
        assert r["mean_score"] == s_sum / (n * 100.0)
        assert r["frac_pos"] == n_pos / n
        assert r["cal_gap"] == abs(s_sum / (n * 100.0) - n_pos / n)


# -- NDCG -------------------------------------------------------------------------

_ranked = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 3)),
    min_size=1, max_size=25, unique_by=lambda t: t).map(
        lambda ts: [(i, s, r) for i, (s, r) in enumerate(ts)])
_k = st.integers(1, 10)


@settings(max_examples=100, deadline=None)
@given(_ranked, _k)
def test_ndcg_oracle_matches_python_reference(items, k):
    """DCG/IDCG from the fixed-order literal-weight sums equal a
    left-to-right Python accumulation with the same weights — and ndcg
    is their single division (NULL when idcg = 0)."""
    views = {"t": pd.DataFrame(items, columns=["item", "s", "rel"])}
    got = _duck(views, ndcg_at_k_sql(
        "SELECT 'q' AS qid, item, s, rel FROM t", "qid", k)).iloc[0]
    gain = {0: 0, 1: 1, 2: 3, 3: 7}
    pred = sorted(items, key=lambda t: (-t[1], t[0]))[:k]
    ideal = sorted(items, key=lambda t: (-t[2], t[0]))[:k]
    dcg = idcg = 0.0
    for p, (_, _, r) in enumerate(pred):
        dcg = dcg + gain[r] * (1.0 / math.log2(p + 2))
    for p, (_, _, r) in enumerate(ideal):
        idcg = idcg + gain[r] * (1.0 / math.log2(p + 2))
    assert got["dcg"] == dcg and got["idcg"] == idcg
    if idcg == 0.0:
        assert pd.isna(got["ndcg"])
    else:
        assert got["ndcg"] == dcg / idcg


# -- RRF --------------------------------------------------------------------------

_rankrows = st.lists(st.integers(1, 60), min_size=1, max_size=20,
                     unique=True).flatmap(
    lambda ras: st.permutations(ras).map(
        lambda rbs: [(i, ra, rb)
                     for i, (ra, rb) in enumerate(zip(ras, rbs))]))


@settings(max_examples=100, deadline=None)
@given(_rankrows, st.integers(1, 8))
def test_rrf_oracle_matches_python_reference(rows, topn):
    views = {"t": pd.DataFrame(rows, columns=["item", "ra", "rb"])}
    got = _duck(views, rrf_fuse_sql(
        "SELECT 'q' AS qid, item, ra, rb FROM t", "qid", 60, topn))
    ref = sorted(
        ((1.0 / (60 + ra) + 1.0 / (60 + rb), item, ra, rb)
         for item, ra, rb in rows),
        key=lambda t: (-t[0], t[1]))[:topn]
    assert len(got) == min(topn, len(rows))
    for row, (rrf, item, ra, rb) in zip(got.itertuples(), ref):
        assert (row.item, row.ra, row.rb, row.rrf) == (item, ra, rb,
                                                       rrf)


# -- Fellegi-Sunter ----------------------------------------------------------------

_agree_pairs = st.lists(
    st.tuples(st.booleans(), st.booleans(), st.booleans()),
    min_size=1, max_size=30)
_mu = st.tuples(
    st.floats(0.6, 0.99), st.floats(0.01, 0.4),
    st.floats(0.6, 0.99), st.floats(0.01, 0.4))


@settings(max_examples=100, deadline=None)
@given(_agree_pairs, _mu)
def test_fs_oracle_matches_python_reference(rows, mu):
    m = (mu[0], mu[2])
    u = (mu[1], mu[3])
    w = [math.log2(mi / ui) for mi, ui in zip(m, u)]
    wb = [math.log2((1 - mi) / (1 - ui)) for mi, ui in zip(m, u)]
    views = {"t": pd.DataFrame(rows,
                               columns=["ag_a", "ag_b", "is_true"])}
    got = _duck(views, fs_decisions_sql(
        "SELECT ag_a, ag_b, is_true FROM t", ("ag_a", "ag_b"),
        m, u, -1.0, 3.0))
    ref: dict = {}
    for a, b, t in rows:
        score = (w[0] if a else wb[0]) + (w[1] if b else wb[1])
        dec = ("match" if score >= 3.0
               else "nonmatch" if score <= -1.0 else "review")
        ref[(dec, t)] = ref.get((dec, t), 0) + 1
    assert {(r["decision"], r["is_true"]): r["n"]
            for _, r in got.iterrows()} == ref


# -- count-min ---------------------------------------------------------------------

_keys = st.lists(st.integers(0, 30), min_size=1, max_size=60)
_dims = st.tuples(st.integers(1, 4), st.sampled_from([2, 8, 64]))


def _cm_bucket_py(k: int, d: int, width: int) -> int:
    h = hashlib.md5(f"{k}:cm".encode()).hexdigest()[8 * d:8 * d + 8]
    return int(h, 16) % width


@settings(max_examples=80, deadline=None)
@given(_keys, _dims)
def test_cm_oracle_matches_python_reference(keys, dims):
    """The SQL sketch+probe equals a direct Python count-min with the
    same md5 hash family; the attestations (est >= true, overcount
    bound) hold on every fuzzed input."""
    depth, width = dims
    probe = sorted(set(keys))[:5] or [0]
    views = {"t": pd.DataFrame({"k": keys})}
    got = _duck(views, cm_probe_sql("SELECT k FROM t", "k", probe,
                                    depth, width))
    counters: dict = {}
    for k in keys:
        for d in range(depth):
            b = _cm_bucket_py(k, d, width)
            counters[(d, b)] = counters.get((d, b), 0) + 1
    for _, r in got.iterrows():
        k = int(r["k"])
        true = keys.count(k)
        est = min(counters.get((d, _cm_bucket_py(k, d, width)), 0)
                  for d in range(depth))
        assert r["n_true"] == true and r["n_est"] == est
        assert r["ge_ok"] == (est >= true)
        assert bool(r["bound_ok"]) == ((est - true) * width
                                       <= 3 * len(keys))
        assert r["ge_ok"]  # CM never undercounts, on any input


# -- ACF ---------------------------------------------------------------------------

_series = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-10, 10)),
    min_size=2, max_size=25, unique_by=lambda t: t[0])


@settings(max_examples=100, deadline=None)
@given(_series, st.integers(1, 4))
def test_acf_oracle_matches_python_reference(series, max_lag):
    """The n²-scaled integer formula equals a direct pairs-available
    Python computation, bit-exactly (one int→double division on both
    sides); lag 0 is exactly 1.0 whenever the series is non-constant;
    EVERY lag 0..max_lag emits a row, zero-pair lags as
    (lag, 0, NULL) via the spine left-join (r8 review)."""
    views = {"t": pd.DataFrame(series, columns=["day", "x"])}
    got = _duck(views, acf_sql("SELECT day, x FROM t", "day", "x",
                               max_lag))
    assert sorted(got["lag"]) == list(range(max_lag + 1))
    by_day = dict(series)
    n = len(series)
    s = sum(x for _, x in series)
    sxx = sum(x * x for _, x in series)
    den = n * n * sxx - n * s * s
    for _, r in got.iterrows():
        lag = int(r["lag"])
        pairs = [(x, by_day[d + lag]) for d, x in series
                 if d + lag in by_day]
        assert r["m_pairs"] == len(pairs)
        num = (n * n * sum(a * b for a, b in pairs)
               - n * s * (sum(a for a, _ in pairs)
                          + sum(b for _, b in pairs))
               + len(pairs) * s * s)
        if den == 0 or not pairs:
            assert pd.isna(r["acf"])
        else:
            assert r["acf"] == float(num) / float(den)
            if lag == 0:
                assert r["acf"] == 1.0
