"""Extensions batch 16 (r8 session, r9 window slots — WINDOW_PLAN.json
r9_new): offline evaluation metrics — the scoring layer a training-data
pipeline runs over model outputs and retrieval rankings.

* ``auc_roc`` — exact per-group ROC AUC via the Mann-Whitney rank-sum
  identity with tie-average ranks (:func:`..operators.evalmetrics
  .auc_roc`). The price score predicts a high-value label carrying
  deterministic 20% label noise, so the driver row exercises a
  non-trivial AUC (~0.77, not a coin flip and not 1.0); the tie-average
  path and the degenerate-group NULL guard are covered by tests.
* ``calibration_bins`` — reliability-diagram aggregation over ten
  equal-width score bins (:func:`..operators.evalmetrics
  .calibration_bins`): observed positive rate vs mean predicted score
  per bin, the per-bin term of ECE — and the scalable stand-in for
  global AUC at 100 TB (one hash aggregate, no rank window).
* ``ndcg_eval`` — NDCG@10 per brand of the price-ranked part catalog
  against a graded size-derived relevance
  (:func:`..operators.evalmetrics.ndcg_at_k`): position pivots +
  literal discount weights keep the weighted sums fixed-shape.
* ``rrf_fusion`` — reciprocal-rank fusion (K=60) of the price ranking
  with the size ranking, top-5 per brand
  (:func:`..operators.evalmetrics.rrf_fuse`) — the standard way a
  retrieval pipeline merges BM25 and embedding rankings without score
  normalization.

Determinism: integer labels/scores/ranks everywhere; every double is
produced inside ONE SQL tail text shared verbatim between the Spark
side (spark.sql over temp views) and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import (
    cents, cents_sql)
from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import evalmetrics as EM

# -- ROC AUC ---------------------------------------------------------------------

# score = the order's total price (exact cents); label = "high-value
# order" (price above the fixed 150k$ line) with DETERMINISTIC 20%
# label noise (flip where o_orderkey % 5 = 0). The score genuinely
# predicts the label, the noise keeps AUC off 1.0 — measured ≈ 0.77 at
# sf0.01, and identical logic at any SF (the driver testdata's status/
# date columns are mutually independent, so the r8 session moved the
# demo off the recency-vs-status pairing whose AUC was a coin flip).
_AUC_PRICE_LINE = 15_000_000  # cents
_AUC_NOISE_MOD = 5


def _auc_spark_src(spark, sf_dir):
    tc = cents(F.col("o_totalprice"))
    flip = F.col("o_orderkey") % _AUC_NOISE_MOD == 0
    return (load_table(spark, sf_dir, "orders")
            .select(F.col("o_orderpriority").alias("g"),
                    F.when((tc > _AUC_PRICE_LINE) != flip, 1)
                    .otherwise(0).alias("label"),
                    tc.alias("s")))


_AUC_LABEL_SQL = (
    f"CASE WHEN ({cents_sql('o_totalprice')} > {_AUC_PRICE_LINE}) "
    f"!= (o_orderkey % {_AUC_NOISE_MOD} = 0) THEN 1 ELSE 0 END")

_AUC_SRC_SQL = (f"SELECT o_orderpriority AS g, "
                f"{_AUC_LABEL_SQL} AS label, "
                f"{cents_sql('o_totalprice')} AS s "
                f"FROM orders")


def q_auc_roc(spark, sf_dir):
    """Per-orderpriority ROC AUC of the price score against the noisy
    high-value label: one rank window on the group shuffle, one hash
    aggregate, one double division (see operators/evalmetrics). Group
    cardinality (5 priorities) bounds the window parallelism — at
    100 TB a single global AUC should instead use the binned
    approximation (``calibration_bins`` at fine width) or stratify and
    average; the exact rank form here is the per-stratum building
    block."""
    return EM.auc_roc(spark, _auc_spark_src(spark, sf_dir), "g")


# -- calibration -----------------------------------------------------------------

# predicted probability proxy = capped price percentile-ish score
# s = min(cents/5000, 9999) over scale 10000 (monotone in price, in
# [0, 1) after normalization); label as in the AUC demo. Bin = decile
# of the integer score: exact int ops, nonnegative by construction.
_CAL_SCALE = 10_000
_CAL_DIV = 5_000
_CAL_BINW = 1_000


def _cal_spark_src(spark, sf_dir):
    tc = cents(F.col("o_totalprice"))
    flip = F.col("o_orderkey") % _AUC_NOISE_MOD == 0
    # `div` (integer division), NOT `/`: Spark's `/` is true division
    # whose double rounding could flip a boundary row vs DuckDB's `//`
    return (load_table(spark, sf_dir, "orders")
            .select(F.when((tc > _AUC_PRICE_LINE) != flip, 1)
                    .otherwise(0).alias("label"),
                    F.least(F.expr(f"{cents_sql('o_totalprice')} "
                                   f"div {_CAL_DIV}"),
                            F.lit(_CAL_SCALE - 1)).alias("s"))
            .withColumn("bin", F.expr(f"s div {_CAL_BINW}")))


_CAL_SRC_SQL = f"""
    SELECT s // {_CAL_BINW} AS bin, label, s FROM (
        SELECT {_AUC_LABEL_SQL} AS label,
               least({cents_sql('o_totalprice')} // {_CAL_DIV},
                     {_CAL_SCALE - 1}) AS s
        FROM orders
    )
"""


def q_calibration_bins(spark, sf_dir):
    """Reliability diagram of the price score vs the noisy high-value
    label over ten equal-width bins: a pure hash aggregate (partial +
    final) — THE shape that survives 100 TB, and the scalable global
    substitute for the exact rank-based AUC. The monotone score makes
    frac_pos climb from ~0.2 to ~0.8 across the bins (the 20% noise
    floor/ceiling), so the gap column is non-degenerate."""
    return EM.calibration_bins(
        spark, _cal_spark_src(spark, sf_dir), _CAL_SCALE)


# -- NDCG ------------------------------------------------------------------------

_NDCG_K = 10


def _ranking_spark_src(spark, sf_dir):
    return (load_table(spark, sf_dir, "part")
            .select(F.col("p_brand").alias("qid"),
                    F.col("p_partkey").alias("item"),
                    cents(F.col("p_retailprice")).alias("s"),
                    (F.col("p_size") % 4).alias("rel")))


_RANKING_SRC_SQL = (f"SELECT p_brand AS qid, p_partkey AS item, "
                    f"{cents_sql('p_retailprice')} AS s, "
                    f"p_size % 4 AS rel FROM part")


def q_ndcg_eval(spark, sf_dir):
    """NDCG@10 per brand: the price-descending catalog ranking scored
    against a graded size-derived relevance. Shuffle key is the query
    id (brand) — embarrassingly parallel across queries at any scale;
    per-query state is the k-position pivot row."""
    return EM.ndcg_at_k(
        spark, _ranking_spark_src(spark, sf_dir), "qid", _NDCG_K)


# -- RRF -------------------------------------------------------------------------

_RRF_K, _RRF_TOPN = 60, 5


def _rrf_spark_src(spark, sf_dir):
    from pyspark.sql import Window
    base = _ranking_spark_src(spark, sf_dir)
    wa = Window.partitionBy("qid").orderBy(F.desc("s"), F.col("item"))
    wb = Window.partitionBy("qid").orderBy(F.col("rel"), F.col("item"))
    return base.select("qid", "item",
                       F.row_number().over(wa).alias("ra"),
                       F.row_number().over(wb).alias("rb"))


_RRF_SRC_SQL = f"""
    SELECT qid, item,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY s DESC, item) AS ra,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY rel, item) AS rb
    FROM ({_RANKING_SRC_SQL})
"""


def q_rrf_fusion(spark, sf_dir):
    """Top-5 per brand under reciprocal-rank fusion (K=60) of the
    price-descending and size-ascending rankings — rank merging without
    score normalization (Cormack et al. 2009). Integer ranks from total
    orders; the fused double is a fixed two-term expression, so its
    ORDER BY is deterministic on both engines."""
    return EM.rrf_fuse(spark, _rrf_spark_src(spark, sf_dir), "qid",
                       _RRF_K, _RRF_TOPN)


QUERIES = {
    "auc_roc": q_auc_roc,
    "calibration_bins": q_calibration_bins,
    "ndcg_eval": q_ndcg_eval,
    "rrf_fusion": q_rrf_fusion,
}

ORACLES = {
    "auc_roc": EM.auc_roc_sql(_AUC_SRC_SQL, "g"),
    "calibration_bins": EM.calibration_bins_sql(_CAL_SRC_SQL,
                                                _CAL_SCALE),
    "ndcg_eval": EM.ndcg_at_k_sql(_RANKING_SRC_SQL, "qid", _NDCG_K),
    "rrf_fusion": EM.rrf_fuse_sql(_RRF_SRC_SQL, "qid", _RRF_K,
                                  _RRF_TOPN),
}
