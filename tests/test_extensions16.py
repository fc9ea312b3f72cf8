"""Unit tests for the batch-16 evaluation metrics (rank-sum AUC,
calibration bins, NDCG@k, reciprocal-rank fusion): hand-computed
references, tie handling, degenerate-group guards, and agreement with
a pure-Python re-derivation on a larger deterministic sample."""

import math

import pytest
from pyspark.sql import Row

from datafusion_delta_sharing_spark.operators import evalmetrics as EM


def _scored(spark, rows):
    return spark.createDataFrame(
        [Row(g=g, label=lb, s=s) for g, lb, s in rows])


# -- AUC -------------------------------------------------------------------------

def test_auc_perfect_separation(spark):
    """All positives above all negatives → AUC exactly 1."""
    rows = [("a", 0, i) for i in range(5)] + \
           [("a", 1, 10 + i) for i in range(5)]
    out = EM.auc_roc(spark, _scored(spark, rows), "g").collect()[0]
    assert (out["n_pos"], out["n_neg"], out["auc"]) == (5, 5, 1.0)


def test_auc_hand_computed_with_ties(spark):
    """labels (1,0) sharing score 5 contribute 1/2 via the tie-average
    rank: scores pos={5,7}, neg={3,5} → pairs: (5>3)=1, (5=5)=.5,
    (7>3)=1, (7>5)=1 → AUC = 3.5/4."""
    rows = [("a", 1, 5), ("a", 1, 7), ("a", 0, 3), ("a", 0, 5)]
    out = EM.auc_roc(spark, _scored(spark, rows), "g").collect()[0]
    assert out["auc"] == pytest.approx(3.5 / 4, abs=0)


def test_auc_degenerate_group_is_null(spark):
    """A group with no negatives (or no positives) has undefined AUC →
    NULL, never a divide error."""
    rows = [("only_pos", 1, 1), ("only_pos", 1, 2),
            ("mixed", 1, 2), ("mixed", 0, 1)]
    out = {r["g"]: r for r in
           EM.auc_roc(spark, _scored(spark, rows), "g").collect()}
    assert out["only_pos"]["auc"] is None
    assert out["mixed"]["auc"] == 1.0


def test_auc_matches_pairwise_reference(spark):
    """Deterministic 60-row sample with heavy ties: the rank-sum AUC
    equals the O(n^2) pairwise definition (wins + half-ties)."""
    rows = [("a", (i * 7) % 3 % 2, (i * i) % 11) for i in range(60)]
    pos = [s for _, lb, s in rows if lb == 1]
    neg = [s for _, lb, s in rows if lb == 0]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    expect = wins / (len(pos) * len(neg))
    out = EM.auc_roc(spark, _scored(spark, rows), "g").collect()[0]
    assert out["auc"] == pytest.approx(expect, abs=1e-12)


# -- calibration -----------------------------------------------------------------

def test_calibration_hand_computed(spark):
    """One bin, scale 10: scores (2,4) labels (0,1) → mean_score .3,
    frac_pos .5, gap .2."""
    df = spark.createDataFrame([Row(bin=0, label=0, s=2),
                                Row(bin=0, label=1, s=4)])
    out = EM.calibration_bins(spark, df, 10).collect()[0]
    assert out["n"] == 2 and out["n_pos"] == 1
    assert out["mean_score"] == pytest.approx(0.3, abs=1e-15)
    assert out["frac_pos"] == 0.5
    assert out["cal_gap"] == pytest.approx(0.2, abs=1e-15)


def test_calibration_perfectly_calibrated_bin(spark):
    """frac_pos == mean_score → gap exactly 0 (same doubles subtract)."""
    df = spark.createDataFrame(
        [Row(bin=1, label=1, s=5), Row(bin=1, label=0, s=5)])
    out = EM.calibration_bins(spark, df, 10).collect()[0]
    assert out["cal_gap"] == 0.0


# -- NDCG ------------------------------------------------------------------------

def _ranked(spark, rows):
    return spark.createDataFrame(
        [Row(qid=q, item=i, s=s, rel=r) for q, i, s, r in rows])


def _ndcg_ref(items, k):
    """Pure-Python NDCG@k: items = [(score, item, rel)]."""
    gain = {0: 0, 1: 1, 2: 3, 3: 7}
    pred = sorted(items, key=lambda t: (-t[0], t[1]))[:k]
    ideal = sorted(items, key=lambda t: (-t[2], t[1]))[:k]
    dcg = sum(gain[r] / math.log2(p + 2)
              for p, (_, _, r) in enumerate(pred))
    idcg = sum(gain[r] / math.log2(p + 2)
               for p, (_, _, r) in enumerate(ideal))
    return dcg / idcg if idcg else None


def test_ndcg_ideal_ranking_is_one(spark):
    """Prediction order == relevance order → NDCG exactly 1."""
    rows = [("q", i, 100 - i, 3 - min(i, 3)) for i in range(6)]
    out = EM.ndcg_at_k(spark, _ranked(spark, rows), "qid", 5).collect()
    assert out[0]["ndcg"] == 1.0


def test_ndcg_matches_reference(spark):
    """20 items, adversarial order, k=10: matches the pure-Python
    definition to float accuracy."""
    rows = [("q", i, (i * 13) % 17, (i * 5) % 4) for i in range(20)]
    expect = _ndcg_ref([(s, i, r) for _, i, s, r in rows], 10)
    out = EM.ndcg_at_k(spark, _ranked(spark, rows), "qid", 10).collect()
    assert out[0]["ndcg"] == pytest.approx(expect, abs=1e-12)


def test_ndcg_all_irrelevant_is_null(spark):
    """rel == 0 everywhere → IDCG = 0 → NULL, not 0/0."""
    rows = [("q", i, i, 0) for i in range(4)]
    out = EM.ndcg_at_k(spark, _ranked(spark, rows), "qid", 3).collect()
    assert out[0]["ndcg"] is None


# -- RRF -------------------------------------------------------------------------

def test_rrf_hand_computed(spark):
    """K=60: item ranked (1,2) scores 1/61+1/62; (2,1) ties it exactly
    (same two terms, addition commutes bit-exactly here because the
    operands are identical), so the tie breaks on item id."""
    df = spark.createDataFrame([Row(qid="q", item=10, ra=1, rb=2),
                                Row(qid="q", item=11, ra=2, rb=1),
                                Row(qid="q", item=12, ra=3, rb=3)])
    out = EM.rrf_fuse(spark, df, "qid", 60, 2).collect()
    assert [r["item"] for r in out] == [10, 11]
    assert out[0]["rrf"] == pytest.approx(1 / 61 + 1 / 62, abs=0)


def test_rrf_topn_bounds_output(spark):
    df = spark.createDataFrame(
        [Row(qid="q", item=i, ra=i + 1, rb=20 - i) for i in range(20)])
    assert EM.rrf_fuse(spark, df, "qid", 60, 5).count() == 5


def test_rrf_fusion_prefers_agreement(spark):
    """An item mid-ranked by BOTH lists beats one top-ranked by a single
    list but buried by the other — the property RRF exists for."""
    df = spark.createDataFrame([
        Row(qid="q", item=1, ra=3, rb=3),     # consistent middle
        Row(qid="q", item=2, ra=1, rb=40),    # one-list champion
        Row(qid="q", item=3, ra=40, rb=1),
        Row(qid="q", item=4, ra=10, rb=10),
    ])
    out = EM.rrf_fuse(spark, df, "qid", 60, 1).collect()
    assert out[0]["item"] == 1
