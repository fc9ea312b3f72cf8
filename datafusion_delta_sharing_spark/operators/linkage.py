"""Probabilistic record linkage — Fellegi–Sunter match scoring.

Reference parity: the reference's relational surface (delegated to
DataFusion, src/lib.rs:16-21) supplies the join/aggregate machinery;
the linkage model itself is the classic Fellegi & Sunter (1969)
decision rule, the standard probabilistic complement of the repo's
blocking generators (``sorted_neighborhood_pairs`` in operators/dedup
and the phone-prefix equi-blocking the registry query uses):

* each candidate pair carries a boolean agreement vector over k fields;
* field i contributes ``log2(m_i/u_i)`` when it agrees and
  ``log2((1-m_i)/(1-u_i))`` when it disagrees, where ``m_i`` /``u_i``
  are the published match / unmatch agreement probabilities;
* the summed score classifies the pair: ``>= upper`` → match,
  ``<= lower`` → nonmatch, else review (the clerical band).

Determinism contract: the weights are double LITERALS baked into one
SQL tail both engines parse, and the score is a fixed-shape k-term sum
(CASE-selected literals added left-to-right) — never an
order-dependent aggregate of doubles. The decision thresholds compare
bit-identical doubles, so the classification is engine-exact.

Scale posture: scoring is a per-row projection over the candidate-pair
relation — the cost driver is the BLOCKING join that produced the
pairs (equi-join on a bounded block key), not this operator. One hash
aggregate for the decision summary.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame


def _fs_tail_sql(src: str, agree_cols: Sequence[str],
                 m: Sequence[float], u: Sequence[float],
                 lower: float, upper: float) -> str:
    """Shared Fellegi–Sunter tail over a candidate-pair relation with
    boolean columns ``agree_cols`` and an ``is_true`` ground-truth
    flag: emits the decision × ground-truth confusion summary
    (decision, is_true, n). Disagreement weights apply on NULL
    agreements too (a missing field is evidence against)."""
    # ADVICE r8: log2(m/u) and log2((1-m)/(1-u)) blow up with a raw
    # ZeroDivisionError/ValueError on degenerate probabilities — guard
    # explicitly like the sibling operators (max_touches, depth, rounds)
    # so a bad calibration fails loudly at build time with the culprit
    # named. m > u is also required: an agreement that is LESS likely
    # among true matches inverts the weight's sign and the thresholds'
    # meaning with it.
    if len(m) != len(agree_cols) or len(u) != len(agree_cols):
        raise ValueError(
            f"m/u need one probability per agreement column: "
            f"{len(agree_cols)} columns, {len(m)} m, {len(u)} u")
    for c, mi, ui in zip(agree_cols, m, u):
        if not (0.0 < ui < mi < 1.0):
            raise ValueError(
                f"Fellegi-Sunter weights for {c!r} need "
                f"0 < u < m < 1, got m={mi!r}, u={ui!r}")
    terms = " + ".join(
        f"(CASE WHEN {c} THEN {math.log2(mi / ui)!r}e0"
        f" ELSE {math.log2((1 - mi) / (1 - ui))!r}e0 END)"
        for c, mi, ui in zip(agree_cols, m, u))
    return f"""
        SELECT decision, is_true, CAST(count(*) AS BIGINT) AS n
        FROM (
            SELECT CASE WHEN score >= {upper!r}e0 THEN 'match'
                        WHEN score <= {lower!r}e0 THEN 'nonmatch'
                        ELSE 'review' END AS decision,
                   is_true
            FROM (
                SELECT {terms} AS score, is_true
                FROM {src}
            )
        )
        GROUP BY decision, is_true
    """


def fs_decisions(spark, pairs: DataFrame, agree_cols: Sequence[str],
                 m: Sequence[float], u: Sequence[float],
                 lower: float, upper: float) -> DataFrame:
    """Fellegi–Sunter decision summary of a candidate-pair frame with
    boolean agreement columns and an ``is_true`` flag. Returns
    (decision, is_true, n)."""
    pairs.createOrReplaceTempView("_fs_pairs")
    return spark.sql(
        _fs_tail_sql("_fs_pairs", agree_cols, m, u, lower, upper))


def fs_decisions_sql(pairs_sql: str, agree_cols: Sequence[str],
                     m: Sequence[float], u: Sequence[float],
                     lower: float, upper: float) -> str:
    """DuckDB mirror of :func:`fs_decisions` — the IDENTICAL tail."""
    return _fs_tail_sql(f"({pairs_sql})", agree_cols, m, u, lower,
                        upper)


def _surv_tail_sql(records: str, entity_col: str,
                   rules_order_sql: str, out_cols_sql: str) -> str:
    """Shared survivorship tail over a resolved-entity records relation:
    ONE rank window per entity under the caller's deterministic rule
    ORDER BY (must end in a unique tiebreak), golden record = rank 1,
    candidate count carried alongside. All integer/string ops — nothing
    engine-divergent. The output column list is explicit because the
    column-pruning star syntax differs across engines (Spark EXCEPT vs
    DuckDB EXCLUDE)."""
    return f"""
        SELECT {out_cols_sql}, n_candidates FROM (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY {entity_col}
                                      ORDER BY {rules_order_sql}) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY {entity_col})
                        AS BIGINT) AS n_candidates
            FROM {records}
        ) WHERE rn = 1
    """


def survivorship(spark, records, entity_col: str,
                 rules_order_sql: str, out_cols_sql: str):
    """Golden-record selection (MDM survivorship) over records already
    resolved to entities (the step after blocking + Fellegi-Sunter
    scoring + clustering): per entity, the record winning the caller's
    rule cascade survives; returns it with ``n_candidates``. The rule
    cascade is an ORDER BY text (completeness first, then freshness,
    then a value rule, ending in a unique key tiebreak) shared verbatim
    with the oracle. One entity-keyed rank window — one shuffle at any
    scale."""
    records.createOrReplaceTempView("_surv_records")
    return spark.sql(_surv_tail_sql("_surv_records", entity_col,
                                    rules_order_sql, out_cols_sql))


def survivorship_sql(records_sql: str, entity_col: str,
                     rules_order_sql: str, out_cols_sql: str) -> str:
    """DuckDB mirror of :func:`survivorship` — the IDENTICAL tail."""
    return _surv_tail_sql(f"({records_sql})", entity_col,
                          rules_order_sql, out_cols_sql)
