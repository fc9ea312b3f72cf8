"""Extensions batch 22: the scd2_repair registry row (r10 session).

The refuse -> repair -> redeliver workflow assertions live inside the
query itself (it raises if the order guard never fires or if any
held-out row remains unapplied after repair); these tests pin the
registry row's shape and its equality to the batch build at sf0.001,
the same contract the DuckDB oracle hashes at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_delta_sharing_spark.harness import extensions22 as E22
from datafusion_delta_sharing_spark.harness.extensions7 import q_scd2_build


def test_scd2_repair_equals_batch_build(spark, sf_dir):
    got = {(r.user_id, r.version): (r.state, r.valid_from, r.valid_to,
                                    r.is_current)
           for r in E22.q_scd2_repair(spark, sf_dir).collect()}
    want = {(r.user_id, r.version): (r.state, r.valid_from, r.valid_to,
                                     r.is_current)
            for r in q_scd2_build(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_scd2_repair_oracle_text_is_the_batch_sql(spark, sf_dir):
    """The oracle is the batch interval SQL verbatim — DuckDB runs it
    and the row count matches the repaired state."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')")
    n_oracle = con.execute(
        f"SELECT count(*) FROM ({E22.ORACLES['scd2_repair']})"
    ).fetchone()[0]
    assert n_oracle == E22.q_scd2_repair(spark, sf_dir).count()


def test_scd2_repair_raises_when_guard_cannot_fire(spark, sf_dir,
                                                   monkeypatch):
    """Non-vacuousness: if the sink accepted the held-out stripe (e.g.
    a regression removed the order guard), the query must raise rather
    than let a trivially-green oracle row stand."""
    from datafusion_delta_sharing_spark.streaming import scd2 as S2

    real_sink = S2.scd2_upsert_sink

    def tolerant_sink(*args, **kwargs):
        merge = real_sink(*args, **kwargs)

        def _merge(batch_df, batch_id):
            try:
                merge(batch_df, batch_id)
            except ValueError:
                pass  # swallow the guard — the regression under test

        return _merge

    monkeypatch.setattr(
        "datafusion_delta_sharing_spark.streaming.scd2.scd2_upsert_sink",
        tolerant_sink)
    with pytest.raises(RuntimeError, match="order guard"):
        E22.q_scd2_repair(spark, sf_dir)


# -- logistic regression -------------------------------------------------------


def _py_logreg(rows, rounds):
    """Pure-Python Newton mirror of logreg_fit_1f for one group:
    identical round structure (round 1 exact from b=0, then IRLS)."""
    import math

    n = len(rows)
    sx = sum(x for x, _ in rows)
    sxx = sum(x * x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    det = float(n) * sxx - float(sx) * sx
    b0 = 4.0 * ((sy - n / 2.0) * sxx - (sxy - sx / 2.0) * sx) / det
    b1 = 4.0 * ((sxy - sx / 2.0) * float(n) - (sy - n / 2.0) * sx) / det
    for _ in range(rounds - 1):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for x, y in rows:
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            w = p * (1.0 - p)
            g0 += y - p
            g1 += x * (y - p)
            h00 += w
            h01 += x * w
            h11 += x * x * w
        det = h00 * h11 - h01 * h01
        b0 += (g0 * h11 - g1 * h01) / det
        b1 += (g1 * h00 - g0 * h01) / det
    ll = 0.0
    for x, y in rows:
        p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        ll += y * math.log(p) + (1 - y) * math.log(1.0 - p)
    return round(b0, 5), round(b1, 5), round(ll / n, 5)


def test_logreg_matches_pure_python_newton(spark):
    from datafusion_delta_sharing_spark.operators import mlprep as ML

    rows = [(x % 11, 1 if (7 * x) % 10 < 2 + (x % 11) // 2 else 0)
            for x in range(400)]
    xy = spark.createDataFrame([("a", x, y) for x, y in rows],
                               "g string, x long, y long")
    got = ML.logreg_fit_1f(spark, xy, "g", rounds=3).collect()[0]
    b0, b1, avg_ll = _py_logreg(rows, 3)
    assert (got.n, got.b0, got.b1, got.avg_ll) == (400, b0, b1, avg_ll)
    assert got.b1 > 0  # the planted law rises in x


def test_logreg_degenerate_and_validation(spark):
    """Constant-x groups have a singular round-1 system and must drop
    out (the oracle's det != 0 filter), healthy siblings survive;
    rounds < 1 refuses on both builders."""
    import pytest as _pytest

    from datafusion_delta_sharing_spark.operators import mlprep as ML

    xy = spark.createDataFrame(
        [("flat", 5, i % 2) for i in range(40)]
        + [("ok", i % 7, 1 if i % 3 == 0 else 0) for i in range(60)],
        "g string, x long, y long")
    out = {r.g for r in ML.logreg_fit_1f(spark, xy, "g", 2).collect()}
    assert out == {"ok"}
    with _pytest.raises(ValueError, match="rounds"):
        ML.logreg_fit_1f(spark, xy, "g", 0)
    with _pytest.raises(ValueError, match="rounds"):
        ML.logreg_fit_1f_sql("SELECT 1", "g", 0)


def test_logreg_registry_row_cross_engine(spark, sf_dir):
    from datafusion_delta_sharing_spark.harness import extensions22 as E22

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')")
    dk = {r[0]: tuple(r[1:])
          for r in con.execute(E22.ORACLES["logreg_fit"]).fetchall()}
    sp = {r.g: (r.n, r.b0, r.b1, r.avg_ll)
          for r in E22.q_logreg_fit(spark, sf_dir).collect()}
    assert sp == dk and len(sp) == 3
    assert all(v[2] > 0 for v in sp.values())  # planted slope recovered
