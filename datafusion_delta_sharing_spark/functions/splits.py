"""Deterministic train/validation/test split assignment.

Assignment is a pure function of (id, salt): hash the id with md5 and
compare the first 8 hex digits against fraction thresholds. Because equal-
length lowercase hex strings compare lexicographically exactly as their
numeric values, the comparison needs no hex-to-int conversion — which keeps
the Spark expression and the DuckDB oracle byte-identical, and makes the
split stable across engines, runs, and cluster sizes (no sample(), no RNG
state). Changing ``salt`` re-deals the split; adding rows never moves
existing ones between splits.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_HEX_SPACE = 16 ** 8


def _hex_threshold(frac: float) -> str:
    """frac in [0,1] -> zero-padded 8-digit lowercase hex boundary."""
    return format(min(int(frac * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def split_assign(id_col: Column | str, salt: str = "v1",
                 train: float = 0.8, val: float = 0.1) -> Column:
    """'train' / 'val' / 'test' label for an id column (test gets the
    remaining 1 - train - val mass)."""
    if not 0 < train + val <= 1:
        raise ValueError(f"train+val must be in (0, 1], got {train + val}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(":" + salt))), 1, 8)
    return (F.when(prefix < _hex_threshold(train), F.lit("train"))
            .when(prefix < _hex_threshold(train + val), F.lit("val"))
            .otherwise(F.lit("test")))


def split_assign_sql(id_col: str, salt: str = "v1",
                     train: float = 0.8, val: float = 0.1) -> str:
    """DuckDB mirror of :func:`split_assign`."""
    prefix = f"substr(md5(CAST({id_col} AS VARCHAR) || ':{salt}'), 1, 8)"
    return (f"CASE WHEN {prefix} < '{_hex_threshold(train)}' THEN 'train' "
            f"WHEN {prefix} < '{_hex_threshold(train + val)}' THEN 'val' "
            f"ELSE 'test' END")


def kfold_assign(id_col: Column | str, k: int, salt: str = "v1") -> Column:
    """Deterministic fold index in [0, k): equal-width partition of the
    md5 hex space (same engine-portable trick as :func:`split_assign`,
    so folds are stable across engines/runs/cluster sizes and adding
    rows never moves existing ones). Cross-validation: fold i is the
    eval split of run i."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(":" + salt))), 1, 8)
    # equal-width hex bins: fold = floor(prefix / (space / k)), built as
    # a threshold CASE so both engines compare strings, not integers
    out = F.lit(k - 1)
    for i in range(k - 1, 0, -1):
        out = F.when(prefix < _hex_threshold(i / k), F.lit(i - 1)) \
            .otherwise(out)
    return out.cast("int")


def kfold_assign_sql(id_col: str, k: int, salt: str = "v1") -> str:
    """DuckDB mirror of :func:`kfold_assign`."""
    prefix = f"substr(md5(CAST({id_col} AS VARCHAR) || ':{salt}'), 1, 8)"
    whens = " ".join(
        f"WHEN {prefix} < '{_hex_threshold(i / k)}' THEN {i - 1}"
        for i in range(1, k))
    return f"CAST(CASE {whens} ELSE {k - 1} END AS INTEGER)"


def group_split_assign(group_col: Column | str, salt: str = "v1",
                       train: float = 0.8, val: float = 0.1) -> Column:
    """Split assignment keyed by a GROUP column (source domain, author,
    near-dup cluster id) instead of the row id: every row of a group
    lands in the same split, so correlated content cannot leak across
    train/test — the leakage-aware complement of :func:`split_assign`."""
    return split_assign(group_col, salt=salt, train=train, val=val)


def group_split_assign_sql(group_col: str, salt: str = "v1",
                           train: float = 0.8, val: float = 0.1) -> str:
    """DuckDB mirror of :func:`group_split_assign`."""
    return split_assign_sql(group_col, salt=salt, train=train, val=val)
