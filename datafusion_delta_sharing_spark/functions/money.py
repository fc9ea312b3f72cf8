"""Exact integer-cents quantization — ONE recipe for every money path.

Streaming state, the upsert sink, and their batch oracles all carry
running totals as integer cents so float accumulation order can never
flip a half-cent boundary between engines. The rounding rule is
half-away-from-zero, which is what BOTH Spark's ``round()`` (HALF_UP)
and DuckDB's ``round()`` implement — previously three hand-rolled
spellings coexisted (``floor(x*100+0.5)``, ``sign*floor(|x|+0.5)``,
``round(x*100)``) that agree on the non-negative values in the corpus
but diverge on negatives (r5 review).

numpy's ``.round()`` is half-EVEN and would diverge on exact .5 cents;
the numpy form below spells half-away-from-zero explicitly and skips
NaN (SQL NULL) entries the way ``sum()`` does.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F


def cents(col: Column) -> Column:
    """Column form: half-away-from-zero integer cents."""
    return F.round(col * 100).cast("bigint")


def cents_sql(expr: str) -> str:
    """SQL-text form of :func:`cents` — ONE spelling BOTH engines
    parse (round() is half-away-from-zero in Spark SQL and DuckDB
    alike), so it is safe inside engine-SHARED fragments and in
    ``F.expr`` on the Spark side, not only in DuckDB oracles."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def cents_sum_np(values) -> int:
    """Sum of half-away-from-zero integer cents over a float array.
    NaN entries (SQL NULLs through ``toPandas``) are SKIPPED like SQL
    ``sum()`` — ``np.floor(NaN).astype('int64')`` is undefined and
    previously injected INT64_MIN into a running total."""
    x = np.asarray(values, dtype="float64") * 100.0
    x = x[~np.isnan(x)]
    return int((np.sign(x) * np.floor(np.abs(x) + 0.5))
               .astype("int64").sum())
