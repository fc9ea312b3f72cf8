"""Extension queries batch 4: physical layout + approximate joins.

Z-order (Morton) clustering — the write-side complement of the stats-based
file pruning in plans/pruning.py: interleave two join/filter columns so
per-file min/max stats are tight on both, then range-partition on the
code. The harness query reports the per-bucket skipping stats themselves
(min/max of both dimensions per Z-range), so the oracle hash-checks the
exact layout the writer would produce; tests/test_layout.py additionally
writes real files and measures span tightness vs a linear sort.

Fuzzy join — n-gram-blocked Levenshtein join with planted single-character
typos, hash-exact against DuckDB's levenshtein.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import fuzzyjoin as FJ
from datafusion_delta_sharing_spark.operators import layout as LAY

_ZBITS = 12
_ZBUCKETS = 16
_ZMASK = (1 << _ZBITS) - 1


def q_zorder_stats(spark, sf_dir):
    """Per-Z-range file stats for orders laid out on (custkey, orderkey)."""
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey").bitwiseAND(F.lit(_ZMASK))).alias("x"),
        (F.col("o_orderkey").bitwiseAND(F.lit(_ZMASK))).alias("y"),
        F.col("o_orderkey").alias("oid"))
    return LAY.zorder_bucket_stats(orders, "x", "y", "oid",
                                   n_buckets=_ZBUCKETS, bits=_ZBITS)


_FJ_CUSTS = 200   # customer subset for the fuzzy join
_FJ_DIST = 1      # planted typos are single substitutions
_FJ_TYPO_POS = 10  # character position substituted in the planted typo
_FJ_TYPO_CH = "X"
# ONE expression string for the planted typo, valid in both Spark SQL and
# DuckDB (concat/substr agree) — position/replacement live only here
_FJ_TYPO_EXPR = (f"concat(substr(c_name, 1, {_FJ_TYPO_POS - 1}), "
                 f"'{_FJ_TYPO_CH}', substr(c_name, {_FJ_TYPO_POS + 1}))")


def q_fuzzy_join(spark, sf_dir):
    """Entity matching with planted typos: every customer name reappears
    with one character substituted (_FJ_TYPO_POS -> _FJ_TYPO_CH); the
    gram-blocked join must recover each (original, typo) pair at distance
    1, plus any true near-collisions among the names themselves."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") < _FJ_CUSTS).select("c_custkey", "c_name")
    typod = cust.select(
        F.col("c_custkey").alias("t_custkey"),
        F.expr(_FJ_TYPO_EXPR).alias("t_name"))
    return FJ.fuzzy_join(cust, typod, "c_custkey", "c_name",
                         "t_custkey", "t_name", max_dist=_FJ_DIST)


_FJ_LEFT_SQL = (f"(SELECT c_custkey, c_name FROM customer"
                f" WHERE c_custkey < {_FJ_CUSTS})")
_FJ_RIGHT_SQL = f"""(
    SELECT c_custkey AS t_custkey, {_FJ_TYPO_EXPR} AS t_name
    FROM customer WHERE c_custkey < {_FJ_CUSTS}
)"""


QUERIES = {
    "zorder_stats": q_zorder_stats,
    "fuzzy_join": q_fuzzy_join,
}

ORACLES = {
    "zorder_stats": LAY.zorder_bucket_stats_sql(
        f"""(SELECT (o_custkey & {_ZMASK}) AS x,
                    (o_orderkey & {_ZMASK}) AS y,
                    o_orderkey AS oid
             FROM orders)""",
        "x", "y", "oid", n_buckets=_ZBUCKETS, bits=_ZBITS),
    "fuzzy_join": FJ.fuzzy_join_sql(
        _FJ_LEFT_SQL, _FJ_RIGHT_SQL, "c_custkey", "c_name",
        "t_custkey", "t_name", max_dist=_FJ_DIST),
}
