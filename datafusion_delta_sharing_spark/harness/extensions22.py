"""Extensions batch 22 (r10 session, r11 window slots — WINDOW_PLAN.json
r11_new): the SCD2 late-data repair workflow (VERDICT r9 #3) and
Newton/IRLS logistic regression.

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
* ``logreg_fit`` — per-group one-feature logistic regression
  (:func:`..operators.mlprep.logreg_fit_1f`): bounded Newton/IRLS
  rounds, round 1 exact from b = 0 (sigmoid ≡ 1/2, no exp()), later
  rounds one hash aggregate each with #groups-row driver state — the
  classifier-fitting sibling of ``ols_fit`` / ``kmeans_fit``, the
  quality-filter training step of an LLM data pipeline.
* ``stump_fit`` — per-group optimal depth-1 decision stump
  (:func:`..operators.mlprep.stump_fit`): exhaustive Gini-minimizing
  split from exact cumulative counts, one aggregate + one window over
  the quantized buckets — the classic weak learner / feature screen
  beside the logistic fit, over the SAME planted-law frame.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.operators import mlprep as ML

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


# -- logistic regression -----------------------------------------------------

# planted signal (the ab_test precedent — the synthetic columns are
# mutually independent, so the label is a deterministic integer law
# both engines compute identically): P(y=1) rises linearly with the
# quantized value bucket and shifts per group. x in 0..15, success rate
# 15-95 % — interior probabilities, no separation, so 3 Newton rounds
# land within ~1e-4 of the fixpoint (measured: round 4 moves b0 by
# <= 1e-4) and round(…, 5) is stable across engines.
_LR_ROUNDS = 3
_LR_XY_SQL = (
    "SELECT user_id % 3 AS g, "
    "CAST(least(floor(value / 25), 15) AS BIGINT) AS x, "
    "CAST(CASE WHEN event_id % 100 < 15 + 5 * (user_id % 3) "
    "+ 4 * least(floor(value / 25), 15) THEN 1 ELSE 0 END AS BIGINT) "
    "AS y "
    "FROM events")


def q_logreg_fit(spark, sf_dir):
    """Per-group logistic fit of the planted conversion law: the xy
    projection is the SAME SQL fragment the oracle wraps (the ols_fit
    no-drift discipline), round 1 is exact integer arithmetic, rounds
    2..3 are one aggregate each over the broadcast-joined coefficients.
    Output (g, n, b0, b1, avg_ll) rounded to 5."""
    register_views(spark, sf_dir, ["events"])
    return ML.logreg_fit_1f(spark, spark.sql(_LR_XY_SQL), "g",
                            rounds=_LR_ROUNDS)


def q_stump_fit(spark, sf_dir):
    """Optimal decision stump over the SAME planted-law xy frame the
    logistic fit consumes (one data contract, two learners): the split
    minimizing weighted Gini, exhaustive over the 16 quantized buckets
    via one aggregate + one cumulative window — exact integer counts,
    fixed-shape impurity doubles, deterministic (impurity, split)
    tie-break."""
    register_views(spark, sf_dir, ["events"])
    return ML.stump_fit(spark, spark.sql(_LR_XY_SQL), "g")


QUERIES = {
    "scd2_repair": q_scd2_repair,
    "logreg_fit": q_logreg_fit,
    "stump_fit": q_stump_fit,
}

ORACLES = {
    "scd2_repair": _scd2_repair_oracle(),
    "logreg_fit": ML.logreg_fit_1f_sql(_LR_XY_SQL, "g", _LR_ROUNDS),
    "stump_fit": ML.stump_fit_sql(_LR_XY_SQL, "g"),
}
