"""Extensions batch 14 (r8, registered for the r9 driver window —
WINDOW_PLAN.json r9_new): tabular-ML feature preparation and
time-series smoothing, the feature-engineering layer a training-data
pipeline runs between curation and training.

* ``target_encode`` — smoothed leave-one-out target encoding of a
  categorical column (:func:`..operators.mlprep.target_encode_loo`).
* ``ols_fit`` — per-group closed-form two-feature OLS via the normal
  equations (:func:`..operators.mlprep.ols_fit_2f`): exact BIGINT raw
  sums in ONE aggregate pass, the Cramer's-rule tail shared verbatim
  with the oracle.
* ``ewma_smooth`` — finite-window exponentially weighted moving average
  per key (:func:`..operators.timeseries.ewma`): integer-cents inputs ×
  dyadic weights make every product and partial sum exact in double.
* ``mutual_info_terms`` — term-presence × label mutual information
  feature selection (:func:`..operators.corpusstats.mutual_info_terms`),
  the information-theoretic complement of chi-square
  ``distinctive_terms``.

Every query here follows the repo determinism contract: exact integer
aggregates, doubles only in fixed-shape shared expressions, round(6) on
the final float columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import (
    cents, cents_sql)
from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.operators import corpusstats as CS
from datafusion_delta_sharing_spark.operators import mlprep as ML
from datafusion_delta_sharing_spark.operators import timeseries as TS

# -- leave-one-out target encoding ---------------------------------------------

_TE_SMOOTHING = 20
_TE_OUT_MOD = 7  # output thinning only — the encoding sees ALL orders


def q_target_encode(spark, sf_dir):
    """LOO-encode o_orderpriority against the order's total price (exact
    cents): the encoding for each order excludes that order's own target
    and shrinks toward the global mean with a 20-order pseudo-count.
    Stats are computed over ALL orders; the output keeps every 7th key
    so the driver row stays result-sized, thinning AFTER the encode on
    both engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        cents(F.col("o_totalprice")).alias("t_cents"))
    enc = ML.target_encode_loo(orders, "o_orderpriority", "t_cents",
                               "o_orderkey", smoothing=_TE_SMOOTHING)
    return enc.filter(F.col("o_orderkey") % _TE_OUT_MOD == 0)


_TE_SRC_SQL = (f"SELECT o_orderkey, o_orderpriority, "
               f"{cents_sql('o_totalprice')} AS t_cents FROM orders")

_TE_ORACLE = f"""
    SELECT * FROM ({ML.target_encode_loo_sql(
        _TE_SRC_SQL, 'o_orderpriority', 't_cents', 'o_orderkey',
        smoothing=_TE_SMOOTHING)})
    WHERE o_orderkey % {_TE_OUT_MOD} = 0
"""

# -- closed-form OLS ------------------------------------------------------------

# dollars (not cents) for y so sum(y*y) stays far inside int64 at sf1+:
# floor() spelled explicitly because Spark CAST(double AS BIGINT)
# truncates while DuckDB rounds — floor is the one shared spelling.
_OLS_XY_SQL = (
    "SELECT l_returnflag AS g, "
    "CAST(floor(l_quantity) AS BIGINT) AS x1, "
    f"{cents_sql('l_discount')} AS x2, "
    "CAST(floor(l_extendedprice) AS BIGINT) AS y "
    "FROM lineitem")


def q_ols_fit(spark, sf_dir):
    """Per-returnflag OLS of price-per-line on (quantity, discount):
    one exact-integer aggregate pass builds the ten raw sums, the shared
    Cramer tail solves the 2-feature normal equations. The xy projection
    is the SAME SQL fragment the oracle wraps, so quantization cannot
    drift between engines."""
    register_views(spark, sf_dir, ["lineitem"])
    return ML.ols_fit_2f(spark, spark.sql(_OLS_XY_SQL), "g")


# -- EWMA smoothing --------------------------------------------------------------

_EWMA_ALPHA, _EWMA_WINDOW, _EWMA_USERS = 0.25, 8, 40

_EWMA_SRC_SQL = (f"(SELECT user_id, event_id, ts, value FROM events "
                 f"WHERE user_id < {_EWMA_USERS} "
                 f"AND value IS NOT NULL)")


def q_ewma_smooth(spark, sf_dir):
    """Finite-window EWMA (alpha=.25, last 8 observations) of each
    user's event values in time order — integer cents × dyadic weights,
    so both engines' arithmetic is bit-identical (see operators/
    timeseries.ewma). User subset bounds the driver row; the operator
    itself is one key-shuffle at any scale."""
    ev = (load_table(spark, sf_dir, "events")
          .filter((F.col("user_id") < _EWMA_USERS)
                  & F.col("value").isNotNull()))
    return TS.ewma(ev, "ts", "user_id", cents(F.col("value")),
                   "event_id", alpha=_EWMA_ALPHA, window=_EWMA_WINDOW)


# -- mutual information ----------------------------------------------------------

_MI_TOP_M = 40

_MI_SRC_SQL = "SELECT doc_id, text, lang FROM documents"


def q_mutual_info(spark, sf_dir):
    """Term-presence × language mutual information over the 40 highest-
    df tokens (deterministic df-desc/token tie-break): the feature-
    selection score a multilingual corpus pipeline ranks candidate
    features with. Exact integer contingency cells; ln only in the final
    rounded expression."""
    docs = load_table(spark, sf_dir, "documents")
    return CS.mutual_info_terms(docs, "text", "doc_id", "lang",
                                top_m=_MI_TOP_M)


QUERIES = {
    "target_encode": q_target_encode,
    "ols_fit": q_ols_fit,
    "ewma_smooth": q_ewma_smooth,
    "mutual_info_terms": q_mutual_info,
}

ORACLES = {
    "target_encode": _TE_ORACLE,
    "ols_fit": ML.ols_fit_2f_sql(_OLS_XY_SQL, "g"),
    "ewma_smooth": TS.ewma_sql(
        _EWMA_SRC_SQL, "ts", "user_id", cents_sql("value"), "event_id",
        alpha=_EWMA_ALPHA, window=_EWMA_WINDOW),
    "mutual_info_terms": CS.mutual_info_terms_sql(
        _MI_SRC_SQL, "text", "doc_id", "lang", top_m=_MI_TOP_M),
}
