"""Extensions batch 23 (r10 continuation session, r11 window slots —
WINDOW_PLAN.json r11_new): the classifier-training / uncertainty
family completion over the established planted-law frames.

* ``naive_bayes_fit`` — multinomial Naive Bayes corpus classifier
  (:mod:`..operators.classify`): fit on the doc_id-fold training
  split, holdout confusion matrix + margin attestations. The
  fastText-style quality-filter shape every LLM corpus pipeline runs;
  one tokenize pass, vocabulary equi-joins, scalar broadcasts.
* ``conformal_interval`` — split conformal prediction
  (:func:`..operators.mlprep.conformal_interval_1f`): OLS on folds
  0-5, the finite-sample ceil(0.9·(n+1))-th order statistic of the
  calibration |residuals| on folds 6-7, EXACT coverage of the ±q̂
  band on folds 8-9. Cross-engine bit-exact by construction (no
  double sums anywhere) — distribution-free uncertainty for model
  filtering at corpus scale.
* ``adaboost_fit`` — discrete AdaBoost over exhaustive stumps
  (:func:`..operators.boosting.adaboost_fit`) on the SAME planted-law
  xy frame ``logreg_fit`` / ``stump_fit`` consume (one data contract,
  three learners): the whole boosting loop runs on the contingency
  cells one aggregate built — ensemble training as scan + metadata.
* ``bootstrap_ci`` — Poisson-bootstrap 95 % CI for a per-group mean
  (:func:`..operators.sampling.bootstrap_ci_mean`, Chamandy et al.
  2012): B = 100 deterministic hash-derived Poisson(1) replicates,
  exact-integer weighted sums, order-statistic percentile bounds —
  the estimator-uncertainty complement to ``conformal_interval``'s
  predictive band, in the same zero-double-sum bit-exactness class.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (harness idiom)

from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.harness.extensions22 import _LR_XY_SQL
from datafusion_delta_sharing_spark.operators import (
    boosting as B, classify as CL, mlprep as ML, sampling as SA)

_ADA_ROUNDS = 3

# bootstrap target: the events value column in exact integer cents
# (functions/money.py recipe — round() is half-away-from-zero on both
# engines), grouped like the other planted-law frames
_BOOT_XY_SQL = ("SELECT user_id % 3 AS g, "
                "CAST(round(value * 100) AS BIGINT) AS y, "
                "event_id AS id FROM events")

# conformal's planted regression law (the logreg/ab_test precedent —
# synthetic columns are mutually independent, so the integer law is
# identical on both engines): y = 500 + 30·x + noise, where the noise
# (event_id % 97 + 7·(user_id % 5), range 0..124) is independent of
# the x bucket, so the OLS fit recovers the slope and the conformal
# band's 90 % target is honest. Folds split on event_id % 10:
# 0-5 train, 6-7 calibrate, 8-9 test.
_CONF_XY_SQL = (
    "SELECT user_id % 3 AS g, "
    "CAST(least(floor(value / 25), 15) AS BIGINT) AS x, "
    "CAST(500 + 30 * least(floor(value / 25), 15) "
    "+ (event_id % 97) + 7 * (user_id % 5) AS BIGINT) AS y, "
    "event_id AS id, CAST(event_id % 10 AS BIGINT) AS fold "
    "FROM events")


def q_naive_bayes_fit(spark, sf_dir):
    """NB corpus classifier on the planted all-of-{'spark','join',
    'hash'} concept (measured 229/271 split at sf0.01): train on
    doc_id % 5 < 4, return the holdout confusion matrix with
    min/avg |log-odds| margins — min_margin is the in-result proof
    that no argmax decision sits inside cross-engine double-sum
    drift (measured >= 4e-4 at sf0.1 vs ~1e-13 drift)."""
    docs = load_table(spark, sf_dir, "documents")
    return CL.naive_bayes_eval(spark, docs, "text", "doc_id")


def q_conformal_interval(spark, sf_dir):
    """Split conformal at alpha = 0.1 over the planted linear law:
    exact OLS from integer sums, order-statistic q-hat with a pure-
    integer rank, exact coverage counts — zero double sums, so the
    whole row is bit-exact across engines (coverage lands 0.86-0.94
    around the 0.9 target at the test SFs)."""
    register_views(spark, sf_dir, ["events"])
    return ML.conformal_interval_1f(spark, spark.sql(_CONF_XY_SQL), "g")


def q_adaboost_fit(spark, sf_dir):
    """Three AdaBoost rounds over the logreg/stump planted-law frame:
    the first stump matches stump_fit's split family, rounds 2-3 push
    training error below any single stump's (the ensemble effect the
    test pins), and min_abs_score attests every sign decision clears
    the drift band (measured >= 0.21)."""
    register_views(spark, sf_dir, ["events"])
    return B.adaboost_fit(spark, spark.sql(_LR_XY_SQL), "g",
                          rounds=_ADA_ROUNDS)


def q_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap 95% CI for each group's mean value (in exact
    cents): 100 hash-derived replicates, every draw an integer
    comparison, every replicate mean ONE division of exact integers,
    CI bounds order statistics — bit-exact across engines with no
    rounding leaps of faith (the conformal_interval class). The CI
    narrows ~sqrt(10)x per SF step, visible across the test SFs."""
    register_views(spark, sf_dir, ["events"])
    return SA.bootstrap_ci_mean(spark, spark.sql(_BOOT_XY_SQL), "g",
                                "id")


QUERIES = {
    "naive_bayes_fit": q_naive_bayes_fit,
    "conformal_interval": q_conformal_interval,
    "adaboost_fit": q_adaboost_fit,
    "bootstrap_ci": q_bootstrap_ci,
}

ORACLES = {
    "naive_bayes_fit": CL.naive_bayes_eval_sql(
        "SELECT * FROM documents", "text", "doc_id"),
    "conformal_interval": ML.conformal_interval_1f_sql(_CONF_XY_SQL, "g"),
    "adaboost_fit": B.adaboost_fit_sql(_LR_XY_SQL, "g", _ADA_ROUNDS),
    "bootstrap_ci": SA.bootstrap_ci_mean_sql(_BOOT_XY_SQL, "g", "id"),
}
