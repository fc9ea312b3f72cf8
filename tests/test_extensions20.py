"""Unit + property tests for the batch-20 operators (multi-touch
attribution, MDM survivorship): hand-computed references, window/cap
boundary behavior, rule-cascade determinism, and a DuckDB-vs-pure-
Python attribution property check."""

import datetime as dt

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from datafusion_delta_sharing_spark.operators import attribution as AT
from datafusion_delta_sharing_spark.operators import linkage as LK


def _ts(h, m=0):
    return dt.datetime(2024, 1, 2, h, m)


def _events(spark, touches, convs):
    t = spark.createDataFrame(
        [Row(user_id=u, ts=ts, event_id=i, channel=c)
         for u, ts, i, c in touches],
        "user_id bigint, ts timestamp_ntz, event_id bigint, "
        "channel string")
    c = spark.createDataFrame(
        [Row(user_id=u, ts=ts, event_id=i) for u, ts, i in convs],
        "user_id bigint, ts timestamp_ntz, event_id bigint")
    return t, c


def test_attribution_hand_computed(spark):
    """One conversion with three in-window touches (view, click, view):
    last = the latest click, first = the oldest view, linear = 1/3 per
    touch."""
    t, c = _events(
        spark,
        [(1, _ts(9), 10, "view"), (1, _ts(10), 11, "click"),
         (1, _ts(11), 12, "view")],
        [(1, _ts(12), 99)])
    out = {r["channel"]: r for r in AT.attribution_credits(
        t, c, "user_id", "ts", "event_id", "channel", 2, 4).collect()}
    assert out["click"]["last_touch"] == 0
    assert out["view"]["last_touch"] == 1   # 11:00 view is latest
    assert out["view"]["first_touch"] == 1  # 9:00 view is oldest
    assert out["view"]["linear_credit"] == pytest.approx(2 / 3)
    assert out["click"]["linear_credit"] == pytest.approx(1 / 3)


def test_attribution_lookback_excludes_stale_touch(spark):
    """A touch older than the lookback window earns nothing."""
    old = dt.datetime(2023, 12, 1, 9)
    t, c = _events(spark, [(1, old, 10, "view"),
                           (1, _ts(9), 11, "click")],
                   [(1, _ts(12), 99)])
    out = {r["channel"]: r for r in AT.attribution_credits(
        t, c, "user_id", "ts", "event_id", "channel", 2, 4).collect()}
    assert "view" not in out
    assert out["click"]["linear_credit"] == 1.0


def test_attribution_cap_keeps_most_recent(spark):
    """max_touches=2 over three touches: the OLDEST drops; first-touch
    credit goes to the oldest SURVIVING touch and linear splits 1/2."""
    t, c = _events(
        spark,
        [(1, _ts(9), 10, "signup"), (1, _ts(10), 11, "view"),
         (1, _ts(11), 12, "click")],
        [(1, _ts(12), 99)])
    out = {r["channel"]: r for r in AT.attribution_credits(
        t, c, "user_id", "ts", "event_id", "channel", 2, 2).collect()}
    assert "signup" not in out
    assert out["view"]["first_touch"] == 1
    assert out["click"]["last_touch"] == 1
    assert out["click"]["linear_credit"] == 0.5


def test_attribution_touch_at_conversion_instant_excluded(spark):
    """Strict t.ts < c.ts: a touch stamped exactly at the conversion
    does not attribute (it cannot have caused it)."""
    t, c = _events(spark, [(1, _ts(12), 10, "view")], [(1, _ts(12), 99)])
    assert AT.attribution_credits(
        t, c, "user_id", "ts", "event_id", "channel", 2, 4).count() == 0


def test_attribution_rejects_unbounded_cap(spark):
    with pytest.raises(ValueError, match="max_touches"):
        AT.attribution_credits(*_events(spark, [], []), "user_id",
                               "ts", "event_id", "channel", 2, 11)


# -- survivorship ----------------------------------------------------------------

_RULES = ("CASE WHEN seg = 'X' THEN 1 ELSE 0 END, "
          "CASE WHEN src = 'B' THEN 0 ELSE 1 END, bal DESC, k")
_COLS = "entity, k, src, bal, seg"


def _recs(spark, rows):
    return spark.createDataFrame(
        [Row(entity=e, k=k, src=s, bal=b, seg=g)
         for e, k, s, b, g in rows],
        "entity bigint, k bigint, src string, bal bigint, seg string")


def test_survivorship_rule_cascade(spark):
    """Completeness beats freshness beats balance: the placeholder-seg
    B record loses to a complete A record despite being newer and
    richer; among complete records B wins."""
    rows = [(1, 10, "A", 100, "ok"), (1, 11, "B", 999, "X"),
            (2, 20, "A", 100, "ok"), (2, 21, "B", 50, "ok")]
    out = {r["entity"]: r for r in LK.survivorship(
        spark, _recs(spark, rows), "entity", _RULES, _COLS).collect()}
    assert out[1]["k"] == 10 and out[1]["n_candidates"] == 2
    assert out[2]["k"] == 21  # fresher snapshot wins when both complete


def test_survivorship_singleton_survives(spark):
    out = LK.survivorship(spark, _recs(spark, [(5, 50, "A", 1, "ok")]),
                          "entity", _RULES, _COLS).collect()
    assert out[0]["k"] == 50 and out[0]["n_candidates"] == 1


# -- attribution property: oracle vs pure Python ----------------------------------

_touch_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 47),
              st.sampled_from(["a", "b"])),
    min_size=0, max_size=25)
_conv_rows = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 47)),
                      min_size=1, max_size=8)


@settings(max_examples=80, deadline=None)
@given(_touch_rows, _conv_rows, st.integers(1, 4))
def test_attribution_oracle_matches_python_reference(touches, convs,
                                                     cap):
    """The SQL mirror equals a direct Python implementation of the
    window/cap/model semantics on fuzzed event streams (hour-grained
    timestamps, 1-day lookback); touch ids offset so they never collide
    with conversion ids."""
    base = dt.datetime(2024, 1, 1)
    tdf = pd.DataFrame(
        [(u, base + dt.timedelta(hours=h), i + 100, ch)
         for i, (u, h, ch) in enumerate(touches)],
        columns=["user_id", "ts", "event_id", "channel"])
    cdf = pd.DataFrame(
        [(u, base + dt.timedelta(hours=h), i)
         for i, (u, h) in enumerate(convs)],
        columns=["user_id", "ts", "event_id"])
    con = duckdb.connect()
    con.register("tt", tdf)
    con.register("cc", cdf)
    got = {r[0]: r[1:] for r in con.execute(AT.attribution_credits_sql(
        "SELECT * FROM tt", "SELECT * FROM cc", "user_id", "ts",
        "event_id", "channel", 1, cap)).fetchall()}

    ref: dict = {}
    for _, conv in cdf.iterrows():
        cand = [
            (row.ts, row.event_id, row.channel)
            for row in tdf.itertuples()
            if row.user_id == conv["user_id"] and row.ts < conv["ts"]
            and row.ts >= conv["ts"] - dt.timedelta(days=1)]
        kept = sorted(cand, key=lambda x: (x[0], x[1]),
                      reverse=True)[:cap]
        n = len(kept)
        for pos, (_, _, ch) in enumerate(kept, start=1):
            e = ref.setdefault(ch, [0, 0, 0.0])
            e[0] += pos == 1
            e[1] += pos == n
            e[2] += 1.0 / n
    assert set(got) == set(ref)
    for ch, (last, first, lin) in ref.items():
        g = got[ch]
        assert (g[0], g[1]) == (last, first)
        assert g[2] == pytest.approx(lin, abs=1e-9)
