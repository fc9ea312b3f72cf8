"""Extension queries batch 4: physical-layout operators.

Z-order (Morton) clustering — the write-side complement of the stats-based
file pruning in plans/pruning.py: interleave two join/filter columns so
per-file min/max stats are tight on both, then range-partition on the
code. The harness query reports the per-bucket skipping stats themselves
(min/max of both dimensions per Z-range), so the oracle hash-checks the
exact layout the writer would produce; tests/test_layout.py additionally
writes real files and measures span tightness vs a linear sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
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


QUERIES = {
    "zorder_stats": q_zorder_stats,
}

ORACLES = {
    "zorder_stats": LAY.zorder_bucket_stats_sql(
        f"""(SELECT (o_custkey & {_ZMASK}) AS x,
                    (o_orderkey & {_ZMASK}) AS y,
                    o_orderkey AS oid
             FROM orders)""",
        "x", "y", "oid", n_buckets=_ZBUCKETS, bits=_ZBITS),
}
