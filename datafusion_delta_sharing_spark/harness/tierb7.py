"""Tier-B batch 7: Variant semi-structured access and the GROUPED_AGG
pandas-UDF tier.

Variant is Spark 4's typed semi-structured column (binary-encoded JSON
with path access that avoids re-parsing text per extraction); at scale it
replaces repeated get_json_object text parses with a single parse +
cheap typed gets. The UDAF query completes the UDF-tier matrix
(scalar pandas UDF / grouped map / UDTF / mapInArrow already covered):
an Arrow-batched GROUPED_AGG aggregates each group in pandas, one batch
per group — the escape hatch for aggregations SQL can't express, kept
oracle-checkable here by choosing a weighted mean."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window, functions as F
from pyspark.sql.functions import pandas_udf

from datafusion_delta_sharing_spark.harness import load_table


def q_variant_funcs(spark, sf_dir):
    """props JSON -> Variant once, typed path gets + per-type aggregate.
    try_variant_get is exercised NON-vacuously on both sides of its
    contract: probing the key that exists ('$.k' — n_k_present must equal
    n, so an accessor that silently degrades to all-NULL fails the hash)
    and the key that doesn't ('$.missing' — identically absent, count 0).
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    per_row = ev.select(
        "event_type",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.k", "bigint").alias("k_try"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"))
    return (per_row.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("k_sum"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max"),
                 F.count("k_try").alias("n_k_present"),
                 F.count("k_missing").alias("n_missing_present")))


# TRY_CAST, not CAST: the Spark side's variant_get coerces-or-NULLs, so a
# regenerated fixture with a non-integral k must surface as a value
# mismatch, not a DuckDB conversion error that kills the whole oracle
_VARIANT_SQL = """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_sum,
           min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS k_min,
           max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS k_max,
           count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS n_k_present,
           count(TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT))
               AS n_missing_present
    FROM events
    GROUP BY event_type
"""


def q_udaf_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas UDAF: quantity-weighted mean price per return
    flag, rounded to a hash-stable fixed point. (The udf is built inside
    the query: pandas_udf resolves its return type against the active
    session, so decorating at import time would fail before a session
    exists.)"""
    @pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(
                weighted_avg_price("l_extendedprice", "l_quantity"), 4)
                .alias("wavg_price")))


_UDAF_SQL = """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
"""


def q_udaf_window(spark, sf_dir):
    """GROUPED_AGG pandas UDAF evaluated OVER A WINDOW FRAME — a distinct
    physical path from the groupBy UDAF (WindowInPandas: Arrow batches
    per bounded frame slice, not per group). Trailing-3-event mean value
    per user; frame ordering made total with the (ts, event_id) tiebreak
    so the result is partition-deterministic."""
    @pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    return (ev.select("user_id", "event_id",
                      F.round(pmean("value").over(w), 6)
                      .alias("trailing_mean"))
            .filter(F.col("event_id") % 20 == 0))


_UDAF_WINDOW_SQL = """
    SELECT user_id, event_id, round(trailing_mean, 6) AS trailing_mean
    FROM (
        SELECT user_id, event_id,
               avg(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS trailing_mean
        FROM events
    ) WHERE event_id % 20 = 0
"""


def q_arrow_grouped_map(spark, sf_dir):
    """applyInArrow grouped map (Spark 4's arrow-native group transform,
    no pandas conversion): per-returnflag summary built with pyarrow
    compute inside the UDF. Types are constructed explicitly — the arrow
    path does NO implicit coercion (int64 -> int32 fails loudly)."""
    def summarize(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        qty = pc.cast(table["l_quantity"], pa.float64())
        return pa.table({
            "l_returnflag": pa.array([table["l_returnflag"][0].as_py()],
                                     pa.string()),
            "n_rows": pa.array([table.num_rows], pa.int64()),
            "sum_qty": pa.array([pc.sum(qty).as_py()], pa.float64()),
        })

    li = load_table(spark, sf_dir, "lineitem")
    return (li.select("l_returnflag", "l_quantity")
            .groupBy("l_returnflag")
            .applyInArrow(summarize,
                          "l_returnflag string, n_rows bigint, "
                          "sum_qty double"))


_ARROW_GM_SQL = """
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
           sum(CAST(l_quantity AS DOUBLE)) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
"""


QUERIES = {
    "variant_funcs": q_variant_funcs,
    "udaf_grouped_agg": q_udaf_grouped_agg,
    "udaf_window": q_udaf_window,
    "arrow_grouped_map": q_arrow_grouped_map,
}

ORACLES = {
    "variant_funcs": _VARIANT_SQL,
    "udaf_grouped_agg": _UDAF_SQL,
    "udaf_window": _UDAF_WINDOW_SQL,
    "arrow_grouped_map": _ARROW_GM_SQL,
}
