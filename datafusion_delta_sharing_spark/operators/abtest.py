"""A/B experiment analysis — two-proportion z and Welch's t from one
aggregate pass.

Reference parity: the reference's relational surface (delegated to
DataFusion, src/lib.rs:16-21) supplies the aggregate machinery; the
statistics are the standard experimentation pair:

* two-proportion pooled z (conversion-rate difference),
* Welch's unequal-variance t with the Welch–Satterthwaite degrees of
  freedom (value-metric difference; Welch 1947).

Determinism contract (the mlprep/OLS pattern): ONE aggregate pass per
arm produces exact BIGINT raw sums (n, Σconv, Σx, Σx²); the centered
moments are then formed in DOUBLE inside a FIXED-shape shared SQL tail
(``n·Σx² − (Σx)²`` — products may exceed int64 at large n, and IEEE
rounding of identical inputs is identical on both engines), and sqrt is
IEEE-754 correctly rounded everywhere, so every output double is
engine-bit-exact. Callers quantize the value metric so Σx² itself stays
inside int64 (dollars, not cents — the ols_fit note). Past that
margin the failure is ASYMMETRIC: DuckDB widens to HUGEINT and errors
on the BIGINT cast, while Spark's non-ANSI sum wraps silently — run
with ``spark.sql.ansi.enabled`` (overflow then errors loudly on both
sides) or quantize coarser before trusting large-SF output.

Scale posture: one partial+final hash aggregate over the experiment
table emitting one row per arm, then a two-row pivot — the whole
analysis is one scan at 100 TB. Degenerate arms (n < 2, zero or full
conversion) yield NULL statistics, never a divide error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


_SUMS = ("count(*) AS n, CAST(sum(conv) AS BIGINT) AS sc, "
         "CAST(sum(v) AS BIGINT) AS sv, "
         "CAST(sum(v * v) AS BIGINT) AS svv")


def _ab_tail_sql(arm_sums: str) -> str:
    """Shared tail over a per-arm sums relation
    (arm in ('A','B'), n, sc, sv, svv): pivots to one row and emits the
    rates, the pooled two-proportion z, the per-arm means, Welch's t,
    and the Welch–Satterthwaite df — every double a fixed-shape
    expression over the exact integer sums."""
    picks = ", ".join(
        f"MAX(CASE WHEN arm = '{a}' THEN {c} END) AS {c}_{a.lower()}"
        for a in ("A", "B") for c in ("n", "sc", "sv", "svv"))
    # ADVICE r8: the two-arm pivot must not silently drop a third or
    # mislabeled arm — surface the violation as an explicit count
    # instead of producing a plausible-looking partial summary. The
    # NULL arm needs its own predicate arm: `NULL NOT IN (..)` is NULL,
    # not true, so without it unassigned-arm rows would still vanish
    # (r9 review, reproduced).
    picks += (", CAST(coalesce(SUM(CASE WHEN arm IS NULL "
              "OR arm NOT IN ('A', 'B') THEN n END), 0) AS BIGINT) "
              "AS n_other")
    var = ("((CAST(n_{a} AS DOUBLE) * svv_{a} "
           "- CAST(sv_{a} AS DOUBLE) * sv_{a}) "
           "/ (CAST(n_{a} AS DOUBLE) * (n_{a} - 1)))")
    va, vb = var.format(a="a"), var.format(a="b")
    se2 = f"({va} / n_a + {vb} / n_b)"
    return f"""
        SELECT n_a, n_b, n_other AS n_other_arms,
               sc_a AS conv_a, sc_b AS conv_b,
               rate_a, rate_b, mean_a, mean_b,
               CASE WHEN pooled = 0e0 OR pooled = 1e0 THEN NULL
                    ELSE (rate_a - rate_b)
                         / sqrt(pooled * (1e0 - pooled)
                                * (1e0 / n_a + 1e0 / n_b)) END
                   AS z_prop,
               CASE WHEN n_a < 2 OR n_b < 2 OR {se2} = 0e0 THEN NULL
                    ELSE (mean_a - mean_b) / sqrt({se2}) END
                   AS t_welch,
               CASE WHEN n_a < 2 OR n_b < 2 OR {se2} = 0e0 THEN NULL
                    ELSE {se2} * {se2}
                         / (({va} / n_a) * ({va} / n_a) / (n_a - 1)
                            + ({vb} / n_b) * ({vb} / n_b) / (n_b - 1))
               END AS df_welch
        FROM (
            SELECT n_a, n_b, n_other,
                   sc_a, sc_b, sv_a, sv_b, svv_a, svv_b,
                   CAST(sc_a AS DOUBLE) / n_a AS rate_a,
                   CAST(sc_b AS DOUBLE) / n_b AS rate_b,
                   CAST(sc_a + sc_b AS DOUBLE) / (n_a + n_b) AS pooled,
                   CAST(sv_a AS DOUBLE) / n_a AS mean_a,
                   CAST(sv_b AS DOUBLE) / n_b AS mean_b
            FROM (SELECT {picks} FROM {arm_sums})
        )
    """


def ab_summary(spark, rows: DataFrame) -> DataFrame:
    """One-row A/B summary of an experiment frame with columns
    (arm in ('A','B'), conv in {0,1}, v exact-integer value metric):
    (n_a, n_b, n_other_arms, conv_a, conv_b, rate_a, rate_b, mean_a,
    mean_b, z_prop, t_welch, df_welch). ``n_other_arms`` counts rows
    whose arm is OUTSIDE {'A','B'} — 0 under the contract; a nonzero
    value means the two-arm statistics describe only a subset of the
    experiment (ADVICE r8: surface the violation, never drop it)."""
    rows.createOrReplaceTempView("_ab_rows")
    spark.sql(f"SELECT arm, {_SUMS} FROM _ab_rows GROUP BY arm"
              ).createOrReplaceTempView("_ab_sums")
    return spark.sql(_ab_tail_sql("_ab_sums"))


def ab_summary_sql(rows_sql: str) -> str:
    """DuckDB mirror of :func:`ab_summary` — the IDENTICAL tail over
    the same raw-sum aggregate."""
    return _ab_tail_sql(
        f"(SELECT arm, {_SUMS} FROM ({rows_sql}) GROUP BY arm)")
