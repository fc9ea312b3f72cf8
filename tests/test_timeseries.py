"""OHLC rollup: bucket assignment and deterministic open/close ties."""

from __future__ import annotations

import datetime as dt

from datafusion_delta_sharing_spark.operators import timeseries as TS


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 10, minute, second, micro)


def test_ohlc_rollup_buckets_and_ties(spark):
    rows = [
        # bucket 10:00 — open decided by id tie-break at identical ts
        (1, "a", _ts(0), 5.0),
        (0, "a", _ts(0), 7.0),    # same ts, lower id -> the open
        (2, "a", _ts(59, 59, 999_999), 9.0),  # last instant -> the close
        (3, "a", _ts(30), 1.0),   # the low
        # next bucket starts exactly on the boundary
        (4, "a", dt.datetime(2024, 1, 1, 11, 0), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz, value double")
    out = {r.bucket_start: r for r in
           TS.ohlc_rollup(df, "ts", "event_type", "value", "event_id",
                          bucket_minutes=60).collect()}
    b0 = out[dt.datetime(2024, 1, 1, 10, 0)]
    assert (b0.n, b0.open, b0.high, b0.low, b0.close) == (4, 7.0, 9.0, 1.0, 9.0)
    b1 = out[dt.datetime(2024, 1, 1, 11, 0)]
    assert (b1.n, b1.open, b1.close) == (1, 2.0, 2.0)


def test_gap_fill_linear_interpolation(spark):
    rows = [
        ("a", dt.datetime(2024, 1, 1, 10, 0), 10.0),
        ("a", dt.datetime(2024, 1, 1, 13, 0), 40.0),   # 11:00->20, 12:00->30
        ("a", dt.datetime(2024, 1, 1, 15, 0), 0.0),    # 14:00->20
        ("b", dt.datetime(2024, 1, 1, 10, 0), 5.0),    # single point
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    out = {(r.key, r.h): (r.observed, r.filled) for r in
           TS.gap_fill_interpolate(df, "ts", "k", "v",
                                   bucket_minutes=60).collect()}
    assert out[("a", dt.datetime(2024, 1, 1, 10, 0))] == (True, 10.0)
    assert out[("a", dt.datetime(2024, 1, 1, 11, 0))] == (False, 20.0)
    assert out[("a", dt.datetime(2024, 1, 1, 12, 0))] == (False, 30.0)
    assert out[("a", dt.datetime(2024, 1, 1, 13, 0))] == (True, 40.0)
    assert out[("a", dt.datetime(2024, 1, 1, 14, 0))] == (False, 20.0)
    assert out[("a", dt.datetime(2024, 1, 1, 15, 0))] == (True, 0.0)
    assert out[("b", dt.datetime(2024, 1, 1, 10, 0))] == (True, 5.0)
    assert len(out) == 7  # b's spine is one bucket, no extrapolation


def test_twap_step_integral(spark):
    rows = [
        (1, "a", _ts(0), 10.0),     # held 10:00-10:30
        (2, "a", _ts(30), 30.0),    # held 10:30-11:00
        (3, "a", dt.datetime(2024, 1, 1, 11, 0), 50.0),  # held 11:00-12:00
        (4, "a", dt.datetime(2024, 1, 1, 12, 0), 99.0),  # terminal: dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user string, ts timestamp_ntz, value double")
    out = {r.bucket_start: r for r in
           TS.twap(df, "ts", "user", "value", "event_id",
                   bucket_minutes=60).collect()}
    h10 = out[dt.datetime(2024, 1, 1, 10, 0)]
    # (10c * 30min + 30c * 30min) / 60min = 20.00
    assert h10.twap_cents == 2000
    assert h10.twap_den == 3600 * 1_000_000
    h11 = out[dt.datetime(2024, 1, 1, 11, 0)]
    assert h11.twap_cents == 5000
    assert len(out) == 2  # nothing after the last observation
