"""Extensions batch 19 (r8 session, r10 window slots — WINDOW_PLAN.json
r10_new): experimentation analysis — the A/B-test statistics and the
targeting-model gains table a data platform runs beside its offline
eval metrics.

* ``ab_test`` — two-proportion pooled z + Welch's unequal-variance t
  with Welch–Satterthwaite df from ONE aggregate pass per arm
  (:func:`..operators.abtest.ab_summary`).
* ``gains_lift`` — cumulative gains / lift table over score bins
  descending (:func:`..operators.evalmetrics.gains_lift`), sharing the
  calibration demo's binned price score so the three targeting views
  (AUC, reliability, gains) describe ONE model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import cents_sql
from datafusion_delta_sharing_spark.harness import (
    extensions16 as E16, load_table)
from datafusion_delta_sharing_spark.operators import abtest as AB
from datafusion_delta_sharing_spark.operators import evalmetrics as EM

# -- A/B test --------------------------------------------------------------------

# arms split on order-key parity; arm B gets a real planted treatment
# effect: a lower conversion bar (242k$ vs 250k$, straddling the
# price median so the density there is high -> ~2pp rate lift) and a
# +8000$ value shift (~3 standard errors at sf0.01) — so z and t are
# decisively nonzero at every SF and GROW with sqrt(n). Value metric
# in DOLLARS, not cents: sum(v*v) must stay inside int64 at large SF
# (the ols_fit note; ~2.4e17 at sf1, margin ~38x).
_AB_LINE_A, _AB_LINE_B = 25_000_000, 24_200_000  # cents
_AB_VALUE_SHIFT_B = 8_000  # dollars

_AB_ROWS_SQL = f"""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
           CASE WHEN o_orderkey % 2 = 0
                THEN CASE WHEN {cents_sql('o_totalprice')}
                          > {_AB_LINE_A} THEN 1 ELSE 0 END
                ELSE CASE WHEN {cents_sql('o_totalprice')}
                          > {_AB_LINE_B} THEN 1 ELSE 0 END
           END AS conv,
           ({cents_sql('o_totalprice')} // 100)
               + CASE WHEN o_orderkey % 2 = 0 THEN 0
                      ELSE {_AB_VALUE_SHIFT_B} END AS v
    FROM orders
"""


def q_ab_test(spark, sf_dir):
    """One-row experiment readout over the parity-armed orders table:
    conversion rates with the pooled two-proportion z, value means with
    Welch's t and df. One partial+final aggregate emitting two rows,
    then a two-row pivot — one scan at any scale. The planted treatment
    effect (lower conversion bar + 8k$ value shift in arm B) keeps both
    statistics decisively nonzero at every SF (measured z ≈ -2.5,
    t ≈ -4.0 at sf0.01, growing ~sqrt(n))."""
    tc = F.expr(cents_sql("o_totalprice"))
    is_a = F.col("o_orderkey") % 2 == 0
    rows = (load_table(spark, sf_dir, "orders")
            .select(F.when(is_a, "A").otherwise("B").alias("arm"),
                    F.when(is_a, (tc > _AB_LINE_A).cast("int"))
                    .otherwise((tc > _AB_LINE_B).cast("int"))
                    .alias("conv"),
                    (F.expr(f"{cents_sql('o_totalprice')} div 100")
                     + F.when(is_a, 0).otherwise(_AB_VALUE_SHIFT_B))
                    .alias("v")))
    return AB.ab_summary(spark, rows)


# -- gains / lift -----------------------------------------------------------------

def q_gains_lift(spark, sf_dir):
    """Cumulative gains and lift over the calibration demo's ten price-
    score bins (descending): the top bins capture positives at ~1.3x
    the random baseline, decaying to exactly 1.0 at the last bin (the
    62%-positive base rate caps attainable lift at 1/0.62 ≈ 1.6) — the
    third targeting view (with auc_roc and calibration_bins) of the
    SAME noisy high-value model. Post-aggregate windows run over ten rows;
    the raw scan is the only data-sized work."""
    return EM.gains_lift(
        spark, E16._cal_spark_src(spark, sf_dir).select("bin", "label"))


_GAINS_SRC_SQL = f"SELECT bin, label FROM ({E16._CAL_SRC_SQL})"


QUERIES = {
    "ab_test": q_ab_test,
    "gains_lift": q_gains_lift,
}

ORACLES = {
    "ab_test": AB.ab_summary_sql(_AB_ROWS_SQL),
    "gains_lift": EM.gains_lift_sql(_GAINS_SRC_SQL),
}
