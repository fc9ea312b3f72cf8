"""Model/ranking evaluation metrics for training-data pipelines.

Reference parity: the reference's relational surface (delegated to
DataFusion, src/lib.rs:16-21) supplies the window/aggregate machinery
these compose; the metrics themselves are the standard offline-eval
layer a data pipeline runs over scored or ranked outputs:

* :func:`auc_roc` — exact ROC AUC per group via the Mann-Whitney
  rank-sum identity ``AUC = (Σ_pos rank_avg − n⁺(n⁺+1)/2) / (n⁺ n⁻)``
  with average ranks over score ties (Hand & Till 2001 formulation).
* :func:`calibration_bins` — reliability-diagram aggregation: per score
  bin, observed positive rate vs mean predicted score and their gap
  (the per-bin term of ECE).
* :func:`ndcg_at_k` — NDCG@k with the standard exponential gain
  ``(2^rel − 1) / log2(pos + 1)`` (Järvelin & Kekäläinen 2002).
* :func:`rrf_fuse` — reciprocal-rank fusion of two rankings,
  ``Σ_r 1/(K + rank_r)`` (Cormack et al. 2009), top-n per query.

Determinism contract (repo-wide, see functions/money.py): callers
provide exact-integer scores/labels/ranks; every sum is an exact BIGINT;
doubles appear only in ONE shared SQL tail that both engines parse, so
the IEEE operations and their order are bit-identical. NDCG's k
discount weights are emitted as double literals into that shared text
and the per-position gains are pivoted to columns, so the weighted sum
is a FIXED-shape expression — never an order-dependent SUM() of
doubles.

Scale posture: AUC is one rank window + one hash aggregate on the group
key (parallelism = group cardinality; for a single global AUC at 100 TB
use the binned approximation — ``calibration_bins`` at fine width — or
stratify, then average); calibration is a pure hash aggregate; NDCG/RRF
are per-query windows whose shuffle key is the query id, embarrassingly
parallel across queries.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _auc_tail_sql(src: str, group_col: str) -> str:
    """Shared rank-sum AUC tail over a (group, label, s) relation with
    ``label`` in {0,1} and ``s`` an exact-integer score. The tie-average
    rank is kept integral as ``rank2 = 2·RANK + |ties| − 1`` (twice the
    average rank), so the only double operation is the final division.
    Groups with no positives or no negatives yield NULL (AUC
    undefined), never 0/0."""
    return f"""
        SELECT {group_col}, n_pos, n_neg,
               CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                    ELSE CAST(s2p - n_pos * (n_pos + 1) AS DOUBLE)
                         / (2e0 * n_pos * n_neg) END AS auc
        FROM (
            SELECT {group_col},
                   CAST(sum(CASE WHEN label = 1 THEN rank2
                            ELSE 0 END) AS BIGINT) AS s2p,
                   CAST(sum(label) AS BIGINT) AS n_pos,
                   CAST(count(*) - sum(label) AS BIGINT) AS n_neg
            FROM (
                SELECT {group_col}, label,
                       2 * RANK() OVER (PARTITION BY {group_col}
                                        ORDER BY s)
                         + COUNT(*) OVER (PARTITION BY {group_col}, s)
                         - 1 AS rank2
                FROM {src}
            ) GROUP BY {group_col}
        )
    """


def auc_roc(spark, scored: DataFrame, group_col: str) -> DataFrame:
    """Exact per-group ROC AUC of a frame with columns
    (group, label, s): one rank window partitioned by the group, one
    hash aggregate, one double division. Returns
    (group, n_pos, n_neg, auc)."""
    scored.createOrReplaceTempView("_auc_src")
    return spark.sql(_auc_tail_sql("_auc_src", group_col))


def auc_roc_sql(src_sql: str, group_col: str) -> str:
    """DuckDB mirror of :func:`auc_roc` — the IDENTICAL tail text."""
    return _auc_tail_sql(f"({src_sql})", group_col)


def _cal_tail_sql(src: str, scale: int) -> str:
    """Shared calibration tail over a (bin, label, s) relation:
    ``s/scale`` is the predicted probability. Exact integer sums; each
    output double is one division (or one fixed-shape difference of two
    such divisions)."""
    return f"""
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(label) AS BIGINT) AS n_pos,
               CAST(sum(s) AS DOUBLE) / (count(*) * {scale}e0)
                   AS mean_score,
               CAST(sum(label) AS DOUBLE) / count(*) AS frac_pos,
               abs(CAST(sum(s) AS DOUBLE) / (count(*) * {scale}e0)
                   - CAST(sum(label) AS DOUBLE) / count(*)) AS cal_gap
        FROM {src}
        GROUP BY bin
    """


def calibration_bins(spark, binned: DataFrame, scale: int) -> DataFrame:
    """Reliability-diagram aggregation of a frame with columns
    (bin, label, s): per bin, count, positives, mean predicted score
    (``s/scale``), observed positive rate, and their absolute gap —
    the per-bin term of expected calibration error. Returns
    (bin, n, n_pos, mean_score, frac_pos, cal_gap)."""
    binned.createOrReplaceTempView("_cal_src")
    return spark.sql(_cal_tail_sql("_cal_src", scale))


def calibration_bins_sql(src_sql: str, scale: int) -> str:
    """DuckDB mirror of :func:`calibration_bins` — identical tail."""
    return _cal_tail_sql(f"({src_sql})", scale)


def _ndcg_tail_sql(src: str, qid_col: str, k: int) -> str:
    """Shared NDCG@k tail over a (qid, item, s, rel) relation with
    integer score ``s`` and graded relevance ``rel`` in {0..3}.

    Predicted order is (s DESC, item) and ideal order is
    (rel DESC, item) — both total, so ROW_NUMBER is deterministic.
    Gains ``2^rel − 1`` pivot to one BIGINT column per position and the
    discounts ``1/log2(pos+1)`` are double literals, so DCG/IDCG are
    fixed-shape expressions with a single left-to-right evaluation
    order on both engines — never an order-dependent SUM of doubles."""
    weights = [1.0 / math.log2(p + 1) for p in range(1, k + 1)]
    g_cols = ", ".join(
        f"CAST(coalesce(max(CASE WHEN p = {i + 1} THEN gain END), 0) "
        f"AS BIGINT) AS g{i + 1}" for i in range(k))
    ig_cols = ", ".join(
        f"CAST(coalesce(max(CASE WHEN ip = {i + 1} THEN gain END), 0) "
        f"AS BIGINT) AS ig{i + 1}" for i in range(k))
    dcg = " + ".join(f"g{i + 1} * {w!r}e0" for i, w in enumerate(weights))
    idcg = " + ".join(
        f"ig{i + 1} * {w!r}e0" for i, w in enumerate(weights))
    return f"""
        SELECT {qid_col}, dcg, idcg,
               CASE WHEN idcg = 0e0 THEN NULL ELSE dcg / idcg END
                   AS ndcg
        FROM (
            SELECT {qid_col}, {dcg} AS dcg, {idcg} AS idcg
            FROM (
                SELECT {qid_col}, {g_cols}, {ig_cols}
                FROM (
                    SELECT {qid_col},
                           ROW_NUMBER() OVER (
                               PARTITION BY {qid_col}
                               ORDER BY s DESC, item) AS p,
                           ROW_NUMBER() OVER (
                               PARTITION BY {qid_col}
                               ORDER BY rel DESC, item) AS ip,
                           CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1
                                    WHEN 2 THEN 3 ELSE 7 END AS gain
                    FROM {src}
                ) WHERE p <= {k} OR ip <= {k}
                GROUP BY {qid_col}
            )
        )
    """


def ndcg_at_k(spark, ranked: DataFrame, qid_col: str, k: int) -> DataFrame:
    """NDCG@k per query over a frame with columns (qid, item, s, rel):
    two row-number windows on the query-id shuffle, a k-column pivot,
    and the fixed-shape weighted sums. Returns (qid, dcg, idcg, ndcg)."""
    ranked.createOrReplaceTempView("_ndcg_src")
    return spark.sql(_ndcg_tail_sql("_ndcg_src", qid_col, k))


def ndcg_at_k_sql(src_sql: str, qid_col: str, k: int) -> str:
    """DuckDB mirror of :func:`ndcg_at_k` — identical tail."""
    return _ndcg_tail_sql(f"({src_sql})", qid_col, k)


def _rrf_tail_sql(src: str, qid_col: str, kconst: int, topn: int) -> str:
    """Shared RRF tail over a (qid, item, ra, rb) relation of two
    integer rank columns: ``rrf = 1/(K+ra) + 1/(K+rb)`` is two exact-
    input divisions plus one addition in fixed order, bit-identical on
    both engines, so ordering by it is deterministic (ties broken by
    item)."""
    return f"""
        SELECT {qid_col}, item, ra, rb, rrf
        FROM (
            SELECT {qid_col}, item, ra, rb, rrf,
                   ROW_NUMBER() OVER (PARTITION BY {qid_col}
                                      ORDER BY rrf DESC, item) AS rn
            FROM (
                SELECT {qid_col}, item, ra, rb,
                       1e0 / ({kconst} + ra) + 1e0 / ({kconst} + rb)
                           AS rrf
                FROM {src}
            )
        ) WHERE rn <= {topn}
    """


def rrf_fuse(spark, ranks: DataFrame, qid_col: str, kconst: int = 60,
             topn: int = 10) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings given as a frame
    with columns (qid, item, ra, rb). Returns the top-n fused items per
    query: (qid, item, ra, rb, rrf)."""
    ranks.createOrReplaceTempView("_rrf_src")
    return spark.sql(_rrf_tail_sql("_rrf_src", qid_col, kconst, topn))


def rrf_fuse_sql(src_sql: str, qid_col: str, kconst: int = 60,
                 topn: int = 10) -> str:
    """DuckDB mirror of :func:`rrf_fuse` — identical tail."""
    return _rrf_tail_sql(f"({src_sql})", qid_col, kconst, topn)


def _gains_tail_sql(src: str) -> str:
    """Shared cumulative-gains/lift tail over a (bin, label) relation
    with integer score bins (higher bin = higher predicted score):
    per-bin counts aggregate first (bin-count-sized), then cumulative
    sums DESCEND from the top bin and every output double is one fixed
    division of exact integers — gain = cumulative share of positives
    captured, lift = gain over the random-targeting baseline. The
    cumulative/total windows run over the post-aggregate bin table
    (tens of rows), never the raw data."""
    return f"""
        SELECT bin, n, n_pos, cum_n, cum_pos,
               CASE WHEN tot_pos = 0 THEN NULL
                    ELSE CAST(cum_pos AS DOUBLE) / tot_pos END AS gain,
               CASE WHEN tot_pos = 0 THEN NULL
                    ELSE (CAST(cum_pos AS DOUBLE) / tot_pos)
                         / (CAST(cum_n AS DOUBLE) / tot_n) END AS lift
        FROM (
            SELECT bin, n, n_pos,
                   CAST(sum(n) OVER (ORDER BY bin DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
                       AS cum_n,
                   CAST(sum(n_pos) OVER (ORDER BY bin DESC
                                         ROWS BETWEEN UNBOUNDED
                                         PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_pos,
                   CAST(sum(n) OVER () AS BIGINT) AS tot_n,
                   CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos
            FROM (
                SELECT bin, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(label) AS BIGINT) AS n_pos
                FROM {src} GROUP BY bin
            )
        )
    """


def gains_lift(spark, binned: DataFrame) -> DataFrame:
    """Cumulative gains / lift table of a frame with columns
    (bin, label): descending from the highest score bin, the share of
    all positives captured (gain) and its ratio to the random baseline
    (lift) — the targeting-model eval beside AUC and calibration.
    Returns (bin, n, n_pos, cum_n, cum_pos, gain, lift)."""
    binned.createOrReplaceTempView("_gains_src")
    return spark.sql(_gains_tail_sql("_gains_src"))


def gains_lift_sql(src_sql: str) -> str:
    """DuckDB mirror of :func:`gains_lift` — identical tail."""
    return _gains_tail_sql(f"({src_sql})")
