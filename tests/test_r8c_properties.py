"""Hypothesis property tests for the r8-session batch 18 operators:
each DuckDB oracle mirror (proven equal to the Spark plan by
compare_oracle at three SFs) is checked against an independent
pure-Python reference on fuzzer-chosen inputs (the
test_r7/r8/r8b_properties pattern). No Spark session."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_delta_sharing_spark.operators.clustering import (
    kmeans_fit_sql)
from datafusion_delta_sharing_spark.operators.graph import kcore_sql
from datafusion_delta_sharing_spark.operators.timeseries import (
    cusum_deviation_sql, seasonal_decompose_sql)


def _duck(views: dict[str, pd.DataFrame], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, pdf in views.items():
        con.register(name, pdf)
    return con.execute(sql).fetchdf()


# -- k-means ------------------------------------------------------------------

_points = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=40)
_rounds = st.integers(1, 3)


def _km_ref(points, init, rounds):
    """Pure-Python Lloyd with first-index-wins ties and empty-cluster
    carry-over — the exact contract both engines implement."""
    cents = list(init)
    out = None
    for _ in range(rounds):
        groups: dict = {}
        for x1, x2 in points:
            ds = [(x1 - c1) * (x1 - c1) + (x2 - c2) * (x2 - c2)
                  for c1, c2 in cents]
            j = min(range(len(cents)), key=lambda i: (ds[i], i))
            groups.setdefault(j, []).append((x1, x2))
        out = {j: (len(g), sum(a for a, _ in g), sum(b for _, b in g))
               for j, g in groups.items()}
        new_cents = []
        for j in range(len(cents)):
            if j in out:
                n, s1, s2 = out[j]
                new_cents.append((s1 / n, s2 / n))
            else:
                new_cents.append(cents[j])  # empty cluster carries over
        cents = new_cents
    return out


@settings(max_examples=60, deadline=None)
@given(_points, _rounds)
def test_kmeans_oracle_matches_python_reference(points, rounds):
    init = [(5.0, 5.0), (25.0, 25.0)]
    views = {"t": pd.DataFrame(points, columns=["x1", "x2"])}
    got = _duck(views, kmeans_fit_sql("SELECT x1, x2 FROM t", init,
                                      rounds))
    ref = _km_ref(points, init, rounds)
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        n, s1, s2 = ref[int(r["j"])]
        assert r["n"] == n
        assert r["c1"] == s1 / n and r["c2"] == s2 / n


# -- k-core --------------------------------------------------------------------

_graph = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1, max_size=30).map(
        lambda es: sorted({(min(a, b), max(a, b))
                           for a, b in es if a != b}))


def _kcore_ref(edges, k, rounds):
    cur = list(edges)
    prev = cur
    for _ in range(rounds):
        deg: dict = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        prev = cur
        cur = [(a, b) for a, b in cur if a in keep and b in keep]
    verts = {v for e in cur for v in e}
    return len(verts), len(cur), len(cur) == len(prev)


@settings(max_examples=80, deadline=None)
@given(_graph, st.integers(1, 4), st.integers(1, 4))
def test_kcore_oracle_matches_python_reference(edges, k, rounds):
    if not edges:
        edges = [(0, 1)]
    views = {"e": pd.DataFrame(edges, columns=["a", "b"])}
    got = _duck(views, kcore_sql("SELECT a, b FROM e", k,
                                 rounds)).iloc[0]
    nv, ne, fix = _kcore_ref(edges, k, rounds)
    assert (got["n_core_vertices"], got["n_core_edges"],
            bool(got["fixpoint_reached"])) == (nv, ne, fix)


# -- seasonal decomposition -------------------------------------------------------

_sd_series = st.lists(
    st.tuples(st.integers(0, 15), st.integers(-20, 20)),
    min_size=3, max_size=16, unique_by=lambda t: t[0])


@settings(max_examples=80, deadline=None)
@given(_sd_series)
def test_seasonal_oracle_matches_python_reference(series):
    period, half = 3, 1
    views = {"t": pd.DataFrame(series, columns=["day", "x"])}
    got = _duck(views, seasonal_decompose_sql(
        "SELECT day, x FROM t", "day", "x", period))
    by_day = dict(series)
    # full-window days, scaled detrended values, per-dow exact means
    det = {d: period * x - sum(by_day[dd]
                               for dd in range(d - half, d + half + 1))
           for d, x in series
           if all(dd in by_day for dd in range(d - half, d + half + 1))}
    sd: dict = {}
    for d, v in det.items():
        sd.setdefault(d % period, []).append(v)
    # EVERY input day emits a row (r8 review: the earlier inner join
    # dropped days whose dow class had no full-window representative)
    assert len(got) == len(series)
    for _, r in got.iterrows():
        d = int(r["day"])
        if d % period in sd:
            vals = sd[d % period]
            seasonal = sum(vals) / (len(vals) * float(period))
            assert r["seasonal"] == seasonal
        else:
            seasonal = None
            assert pd.isna(r["seasonal"])
        if d in det and seasonal is not None:
            s7 = sum(by_day[dd] for dd in range(d - half, d + half + 1))
            trend = s7 / float(period)
            assert r["trend"] == trend
            assert r["resid"] == by_day[d] - trend - seasonal
        else:
            assert pd.isna(r["trend"]) and pd.isna(r["resid"])


# -- CUSUM -----------------------------------------------------------------------

_cu_series = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-10, 10)),
    min_size=1, max_size=20, unique_by=lambda t: t[0])


@settings(max_examples=80, deadline=None)
@given(_cu_series)
def test_cusum_oracle_matches_python_reference(series):
    views = {"t": pd.DataFrame(series, columns=["day", "x"])}
    got = _duck(views, cusum_deviation_sql("SELECT day, x FROM t",
                                           "day", "x"))
    srt = sorted(series)
    n, sx = len(srt), sum(x for _, x in srt)
    cum, ref = 0, {}
    for t, (d, x) in enumerate(srt, start=1):
        cum += x
        ref[d] = n * cum - t * sx
    mx = max(abs(v) for v in ref.values())
    for _, r in got.iterrows():
        d = int(r["day"])
        assert r["ns_t"] == ref[d]
        assert bool(r["is_peak"]) == (abs(ref[d]) == mx)
