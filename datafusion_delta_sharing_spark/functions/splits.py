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


def _check_fractions(train: float, val: float) -> None:
    """Each fraction must be individually sane: validating only the SUM
    let train=-0.1/val=0.9 through, and a negative threshold formats as
    '-1999...' whose '-' sorts below every hex digit — train silently
    EMPTY, no error (r5 review)."""
    if train <= 0 or val < 0 or train + val > 1:
        raise ValueError(
            f"need train > 0, val >= 0, train+val <= 1; got "
            f"train={train}, val={val}")


def split_assign(id_col: Column | str, salt: str = "v1",
                 train: float = 0.8, val: float = 0.1) -> Column:
    """'train' / 'val' / 'test' label for an id column (test gets the
    remaining 1 - train - val mass; NULL ids stay NULL — md5(NULL) made
    every branch NULL and the otherwise() silently dumped all NULL ids
    into 'test', skewing held-out evaluation)."""
    _check_fractions(train, val)
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(":" + salt))), 1, 8)
    if train + val >= 1:
        # 'val' must be the OTHERWISE arm when it closes the space: the
        # threshold for 1.0 clamps to 'ffffffff' and the strict '<' would
        # leak prefix=='ffffffff' ids (2^-32 each — real at corpus scale)
        # into a 'test' split the caller believes is empty
        label = (F.when(prefix < _hex_threshold(train), F.lit("train"))
                 .otherwise(F.lit("val")))
    else:
        label = (F.when(prefix < _hex_threshold(train), F.lit("train"))
                 .when(prefix < _hex_threshold(train + val), F.lit("val"))
                 .otherwise(F.lit("test")))
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(label)


def _sql_salt(salt: str) -> str:
    """Escape the salt for embedding in a single-quoted SQL literal — an
    apostrophe in a legal salt broke the oracle query (r5 review)."""
    return salt.replace("'", "''")


def split_assign_sql(id_col: str, salt: str = "v1",
                     train: float = 0.8, val: float = 0.1) -> str:
    """DuckDB mirror of :func:`split_assign`."""
    _check_fractions(train, val)
    prefix = (f"substr(md5(CAST({id_col} AS VARCHAR) || "
              f"':{_sql_salt(salt)}'), 1, 8)")
    if train + val >= 1:
        body = (f"CASE WHEN {prefix} < '{_hex_threshold(train)}' "
                f"THEN 'train' ELSE 'val' END")
    else:
        body = (f"CASE WHEN {prefix} < '{_hex_threshold(train)}' THEN 'train' "
                f"WHEN {prefix} < '{_hex_threshold(train + val)}' THEN 'val' "
                f"ELSE 'test' END")
    return f"CASE WHEN {id_col} IS NULL THEN NULL ELSE {body} END"


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
    # NULL ids stay NULL (not silently fold k-1 via the otherwise arm)
    return F.when(c.isNull(), F.lit(None)).otherwise(out).cast("int")


def kfold_assign_sql(id_col: str, k: int, salt: str = "v1") -> str:
    """DuckDB mirror of :func:`kfold_assign`."""
    prefix = (f"substr(md5(CAST({id_col} AS VARCHAR) || "
              f"':{_sql_salt(salt)}'), 1, 8)")
    whens = " ".join(
        f"WHEN {prefix} < '{_hex_threshold(i / k)}' THEN {i - 1}"
        for i in range(1, k))
    return (f"CAST(CASE WHEN {id_col} IS NULL THEN NULL "
            f"ELSE CASE {whens} ELSE {k - 1} END END AS INTEGER)")


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
