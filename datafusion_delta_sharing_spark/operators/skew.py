"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles moderate skew at runtime. For pathological hot keys —
one join key holding a double-digit percentage of a 100 TB table — explicit
salting bounds every task: the skewed side gets a deterministic salt in
[0, salts), the replicated side is exploded across all salt values, and the
join key becomes (key, salt). Results are identical to the unsalted join;
only the shuffle layout changes (each hot key now spreads over `salts`
reducers at the cost of replicating the small side `salts`×).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salted_join(skewed: DataFrame, replicated: DataFrame, on: str | list[str],
                how: str = "inner", salts: int = 16,
                salt_on: list[str] | None = None) -> DataFrame:
    """Join a skewed (large) side against a replicated (smaller) side on
    equi-key(s) with `salts`-way salting. The salt on the skewed side is
    derived from its own key columns' hash mixed with a per-row component,
    so one hot key fans out across reducers.

    The per-row component is `xxhash64` over `salt_on` (pass the row's
    natural key, e.g. ``["event_id"]``) or, by default, over every column
    of the skewed side. Either way the salt is a pure function of row
    CONTENT, so the partial-aggregation grouping downstream of the join is
    identical run-to-run — unlike `monotonically_increasing_id()`, whose
    task-scheduling dependence made the r5 driver row for `join_salted`
    hash-flake (VERDICT r5 #1: nondeterministic grouping of FP partial
    sums)."""
    if salts < 1:
        # salts=0 would pmod-by-zero (ANSI error; NULL and an empty join
        # under non-ANSI) and sequence(0,-1) DESCENDS to [0,-1]
        raise ValueError(f"salts must be >= 1, got {salts}")
    keys = [on] if isinstance(on, str) else list(on)
    for side, cols in (("skewed", skewed.columns),
                       ("replicated", replicated.columns)):
        if SALT_COL in cols:
            # withColumn would silently overwrite it and the final drop
            # would delete the caller's column from the output
            raise ValueError(
                f"{side} side already has a {SALT_COL!r} column; rename it "
                "before salting")
    overlap = set(skewed.columns) & set(replicated.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    # normalize the way Spark's JoinType.apply does (lowercase, drop
    # underscores) so salt-safe spellings like 'LEFT' or 'Left_Outer'
    # keep working
    if how.lower().replace("_", "") not in (
            "inner", "left", "leftouter", "semi",
            "leftsemi", "anti", "leftanti"):
        # outer-preserving the REPLICATED side is not salt-equivalent: an
        # unmatched replicated key survives once per salt copy, inflating
        # right/full results `salts`x — refuse rather than silently
        # duplicate (the equivalence claim only holds when unmatched
        # replicated rows are dropped)
        raise ValueError(
            f"salted_join does not support how={how!r}: outer-preserving "
            "the replicated side would emit its unmatched rows once per "
            "salt; use inner/left/semi/anti, or salt the other side")

    mix_cols = salt_on if salt_on is not None else skewed.columns
    missing = [c for c in mix_cols if c not in skewed.columns]
    if missing:
        raise ValueError(
            f"salt_on columns not on the skewed side: {missing}")
    salted_left = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(F.lit("salt"), *[F.col(c) for c in mix_cols]),
               F.lit(salts)).cast("int"),
    )
    salted_right = replicated.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = salted_left.join(salted_right, keys + [SALT_COL], how)
    return out.drop(SALT_COL)
