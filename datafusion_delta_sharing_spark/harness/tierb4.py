"""Tier-B batch 4: cross join, null-safe equality, deterministic collect
aggregation, min_by/max_by arg-extrema."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table


def q_cross_join(spark, sf_dir):
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    return (
        region.crossJoin(nation)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.sum("n_nationkey").cast("bigint").alias("key_sum"))
    )


def q_null_safe_eq(spark, sf_dir):
    """Null-safe equality (<=>): compare lag-shifted event values where the
    first row per user yields NULL."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = (load_table(spark, sf_dir, "events")
          .withColumn("prev_type", F.lag("event_type").over(w)))
    return (
        ev.select(
            "event_id",
            F.col("event_type").eqNullSafe(F.col("prev_type"))
            .alias("same_as_prev"),
            (F.col("prev_type").isNull()).alias("is_first"),
        )
    )


def q_collect_agg(spark, sf_dir):
    """Deterministic collect: sort_array(collect_list) then join to a string
    (collect order itself is nondeterministic — never hash raw collect)."""
    return (
        load_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|")
            .alias("nations"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_min_max_by(spark, sf_dir):
    """Arg-extrema: the orderkey of the cheapest/priciest order per
    priority (unique totalprice per key not guaranteed — break ties by
    taking min/max of candidate keys via struct ordering)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.min(F.struct("o_totalprice", "o_orderkey"))["o_orderkey"]
            .alias("cheapest_key"),
            F.max(F.struct("o_totalprice", "o_orderkey"))["o_orderkey"]
            .alias("priciest_key"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


QUERIES = {
    "cross_join": q_cross_join,
    "null_safe_eq": q_null_safe_eq,
    "collect_agg": q_collect_agg,
    "min_max_by": q_min_max_by,
}

ORACLES = {
    "cross_join": """
        SELECT r_name, count(*) AS n_pairs,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM region CROSS JOIN nation
        GROUP BY r_name
    """,
    "null_safe_eq": """
        SELECT event_id,
               event_type IS NOT DISTINCT FROM prev_type AS same_as_prev,
               prev_type IS NULL AS is_first
        FROM (
            SELECT event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
    """,
    "collect_agg": """
        SELECT n_regionkey,
               string_agg(n_name, '|' ORDER BY n_name) AS nations,
               count(*) AS n
        FROM nation GROUP BY n_regionkey
    """,
    "min_max_by": """
        SELECT o_orderpriority,
               min(CASE WHEN rn_asc = 1 THEN o_orderkey END) AS cheapest_key,
               min(CASE WHEN rn_desc = 1 THEN o_orderkey END) AS priciest_key,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey)
                       AS rn_asc,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC,
                                               o_orderkey DESC) AS rn_desc
            FROM orders
        )
        GROUP BY o_orderpriority
    """,
}
