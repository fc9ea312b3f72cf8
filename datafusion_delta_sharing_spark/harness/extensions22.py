"""Extensions batch 22 (r10 session, r11 window slots — WINDOW_PLAN.json
r11_new): the SCD2 late-data repair workflow, end-to-end (VERDICT r9 #3).

* ``scd2_repair`` — the full refuse → repair → redeliver cycle of
  :mod:`..streaming.scd2`: a held-out stripe of middle-of-history CDC
  events is merged AFTER its entities' later events, the sink's order
  guard refuses it loudly, ``repair_entities`` batch-rebuilds exactly
  the affected entities from the full log, and ``unapplied_events``
  proves the redelivered stripe is now fully applied. The returned
  dimension must equal the batch ``scd2_build`` over the complete log —
  the oracle IS the batch interval SQL, so the driver's hash compare
  attests the repair produced bit-exact history, not merely plausible
  rows.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_delta_sharing_spark.harness import load_table

_REPAIR_USER_BOUND = 100  # same entity subset as scd2_build / the stream


def q_scd2_repair(spark, sf_dir):
    """Late-data repair end-to-end. The (user_id < 100) change log is
    split deterministically: each entity with >= 3 events HOLDS OUT its
    2nd event in the per-entity (ts, event_id) order. The remaining log
    merges first (per-entity order intact, so the sink accepts); the
    held-out stripe then arrives — every one of its events predates its
    entity's open interval, so the order guard MUST refuse (the query
    raises if it does not: a vacuous repair never reaches the oracle).
    ``repair_entities`` rebuilds the affected entities from the full
    log; ``unapplied_events`` then shows the redelivered stripe fully
    applied (the query raises if any row remains). Scale shape: the
    holdout ranking is one window over the bounded entity subset, the
    repair rewrites only the touched buckets, and the affected-entity
    list is bounded by the stripe's distinct keys (the sinks'
    bucket-list collect contract)."""
    import tempfile

    from datafusion_delta_sharing_spark.streaming.scd2 import (
        repair_entities, scd2_state, scd2_upsert_sink, unapplied_events,
    )

    log = (load_table(spark, sf_dir, "events")
           .filter(F.col("user_id") < _REPAIR_USER_BOUND)
           .select("user_id",
                   F.col("event_type"),
                   F.col("ts").cast("timestamp").alias("ts"),
                   "event_id"))
    wu = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    ranked = (log.withColumn("__rn", F.row_number().over(wu))
              .withColumn("__n", F.count(F.lit(1))
                          .over(Window.partitionBy("user_id")))
              ).localCheckpoint()  # bounded subset, reused four times
    held_out = (ranked.filter((F.col("__rn") == 2) & (F.col("__n") >= 3))
                .drop("__rn", "__n"))
    applied = (ranked.filter(~((F.col("__rn") == 2)
                               & (F.col("__n") >= 3)))
               .drop("__rn", "__n"))

    # precondition, checked FIRST (r10 review): an sf_dir where no
    # entity has >= 3 events makes the holdout empty and the sink would
    # return without refusing — the else-branch below would then blame
    # a removed order guard when the real cause is a vacuous data shape
    if not held_out.limit(1).count():
        raise RuntimeError(
            "scd2_repair: no entity with >= 3 events at this sf_dir — "
            "the holdout stripe is empty and the refuse->repair cycle "
            "cannot be exercised")

    state_dir = tempfile.mkdtemp(prefix="scd2_repair_state_")
    sink = scd2_upsert_sink(spark, state_dir, n_buckets=8,
                            run_id=f"{state_dir}-run")
    sink(applied, 0)
    try:
        sink(held_out, 1)
    except ValueError:
        pass
    else:  # the guard not firing means the repair below proves nothing
        raise RuntimeError(
            "scd2_repair: the held-out stripe merged without tripping "
            "the order guard — the refuse->repair cycle was not "
            "exercised")
    affected = sorted(r.user_id for r in
                      held_out.select("user_id").distinct().collect())
    repair_entities(spark, state_dir, log, affected)
    leftover = unapplied_events(spark, state_dir, held_out).count()
    if leftover:
        raise RuntimeError(
            f"scd2_repair: {leftover} held-out event(s) still unapplied "
            "after repair — the rebuild missed rows")
    return scd2_state(spark, state_dir)


def _scd2_repair_oracle() -> str:
    # repaired state == the batch build over the COMPLETE log, verbatim
    from datafusion_delta_sharing_spark.harness.extensions7 import (
        _SCD2_SQL,
    )

    return _SCD2_SQL


QUERIES = {
    "scd2_repair": q_scd2_repair,
}

ORACLES = {
    "scd2_repair": _scd2_repair_oracle(),
}
