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
