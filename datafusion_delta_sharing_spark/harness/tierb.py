"""Tier-B relational surface: the SQL capability the reference exposes via
its embedded DataFusion engine (SURVEY.md §2 Tier B), demonstrated Spark-first
with DuckDB oracles. Every category in the Tier-B table has >=1 query here:
scans, all join flavors, aggregation/rollup/cube, windows + frames, sort/
limit/top-k, set ops, scalar function families, subqueries/CTE, UDF tiers.

Conventions: computed columns aliased identically on both sides; double
aggregates rounded; DuckDB integer aggregates cast to BIGINT (see
harness/__init__.py docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from datafusion_delta_sharing_spark.harness import load_table, register_views


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scan / projection / filter / limit (the reference's own flagship shape,
# examples/query_from_catalog.rs:21)
# ---------------------------------------------------------------------------


def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter + limit: the flagship query shape (F6)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate")
        .filter(F.col("o_totalprice") < 5000.0)
        .orderBy("o_orderkey")
        .limit(25)
    )


def q_scan_filter_project(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1995-01-01")
                & (F.col("l_shipdate") < "1996-01-01")
                & (F.col("l_discount") > 0.03))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


def q_filter_compound(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            ((F.col("o_orderstatus") == "O")
             & F.col("o_totalprice").between(1000.0, 20000.0))
            | (F.col("o_orderpriority").like("1-%")
               & ~F.col("o_custkey").isin(1, 2, 3))
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Joins: inner / left / right / full / semi / anti / theta / range / broadcast
# ---------------------------------------------------------------------------


def q_join_inner(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_join_left(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2)
             .alias("total_spent"))
    )


def q_join_right(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # right join written from the orders side: every customer survives
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_nationkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_join_full(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey, "full")
        .select(
            F.coalesce("n_nationkey", "s_nationkey").alias("nk"),
            "n_name", "s_suppkey",
        )
        .groupBy("nk", "n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


def q_join_semi(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


def q_join_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


def q_join_theta(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    region = _t(spark, sf_dir, "region")
    # non-equi condition -> BroadcastNestedLoopJoin
    return (
        part.join(region, F.col("p_size") > F.col("r_regionkey") * 10)
        .groupBy("r_regionkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q_join_range(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= F.expr("o_orderdate + INTERVAL 30 DAYS"))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_shipped_30d"),
             F.round(F.sum("l_quantity"), 2).alias("qty_30d"))
    )


def q_join_broadcast(spark, sf_dir):
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")  # small dim: broadcast explicitly
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_suppliers"),
             F.round(F.avg("s_acctbal"), 2).alias("avg_bal"))
    )


def q_join_asof(spark, sf_dir):
    """As-of join (Spark lacks a native one): for each 'error' event, the
    most recent 'click' timestamp by the same user — expressed as a
    union-window composition (SURVEY.md §2 custom-operator preference (a))."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    clicks_before = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_click_ts", clicks_before)
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


def q_tpch_q1(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                          * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_agg_having(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"),
             F.count(F.lit(1)).alias("n"))
        .filter(F.col("total") > 300000.0)
    )


def q_distinct(spark, sf_dir):
    return (_t(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_linestatus").distinct())


def q_count_distinct(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_custs"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def q_approx_count_distinct(spark, sf_dir):
    """HLL++ sketch, bound-checked (VERDICT r2 #6): the estimate itself is
    engine-specific, so the oracle-checked output is the EXACT distinct
    count plus a deterministic boolean asserting the sketch landed within
    5x the requested rsd (2% -> 10% bound; HLL++ error is ~1/sqrt(m), a few
    rsd at worst). Wrong sketch wiring -> within_tol false -> hash FAIL."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
             F.countDistinct("l_partkey").alias("exact_parts"))
        .select(
            "l_returnflag", "exact_parts",
            (F.abs(F.col("_approx") - F.col("exact_parts"))
             / F.col("exact_parts") <= 0.10).alias("within_tol"))
    )


def q_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
    )


def q_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"),
             F.count(F.lit(1)).alias("n"))
    )


def q_grouping_sets(spark, sf_dir):
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


def q_agg_stats(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_quantity"), 2).alias("min_qty"),
            F.round(F.max("l_quantity"), 2).alias("max_qty"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.stddev("l_quantity"), 4).alias("std_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        )
    )


def q_pivot(spark, sf_dir):
    pivoted = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .sum("l_quantity")
    )
    return pivoted.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_f"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_o"),
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


def q_window_rank(spark, sf_dir):
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .withColumn("rnk", F.rank().over(w).cast("bigint"))
        .withColumn("drnk", F.dense_rank().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice",
                "rn", "rnk", "drnk")
    )


def q_window_running(spark, sf_dir):
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("run_total", F.round(F.sum("o_totalprice").over(w), 2))
        .select("o_orderkey", "o_custkey", "run_total")
    )


def q_window_lag_lead(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("prev_value", F.lag("value").over(w))
        .withColumn("next_value", F.lead("value").over(w))
        .select("event_id", "user_id", "prev_value", "next_value")
    )


def q_window_range_frame(spark, sf_dir):
    w = (W.partitionBy("l_returnflag").orderBy("l_quantity")
         .rangeBetween(-5, W.currentRow))
    return (
        _t(spark, sf_dir, "lineitem")
        .withColumn("frame_sum",
                    F.round(F.sum("l_extendedprice").over(w), 2))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
                "frame_sum")
    )


def q_topk_per_group(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


def q_topk_global(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


def q_union_all(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nk"))
    return cust.unionByName(supp)


def q_union_distinct(spark, sf_dir):
    return q_union_all(spark, sf_dir).distinct()


def q_intersect(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nk"))
    return cust.intersect(supp)


def q_except(spark, sf_dir):
    # the subtracted side is restricted to low supplier keys: full-table
    # suppliers cover all 25 nation keys at sf0.01+, which made the
    # difference structurally empty — an EXCEPT bug returning nothing
    # would have hashed PASS (empty == empty)
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("nk"))
    supp = (_t(spark, sf_dir, "supplier")
            .filter(F.col("s_suppkey") <= 10)
            .select(F.col("s_nationkey").cast("int").alias("nk")))
    return nation.subtract(supp)  # EXCEPT (distinct)


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


def q_string_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_brand").alias("brand_lower"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name_pfx"),
            F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        )
    )


def q_date_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1995-01-01").cast("date"))
            .cast("bigint").alias("days_since_95"),
        )
    )


def q_math_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_linenumber",
            # product of two 2-decimal values has exactly 4 decimals: round at
            # native precision (rounding at 3 would hit true .5 ties, where
            # Spark HALF_UPs and DuckDB HALF_EVENs)
            F.round(F.col("l_extendedprice") * F.col("l_discount"), 4)
            .alias("disc_amt"),
            F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
            F.ceil("l_discount").alias("disc_ceil"),
            F.floor("l_extendedprice").alias("price_floor"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
            F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
            F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
            (F.col("l_linenumber") % 3).cast("bigint").alias("ln_mod3"),
        )
    )


def q_conditional(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 200000, "high")
            .when(F.col("o_totalprice") > 50000, "mid")
            .otherwise("low").alias("tier"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN"))
            .alias("status_or_open"),
            F.greatest("o_totalprice", F.lit(1000.0)).alias("price_floor_1k"),
            F.least("o_totalprice", F.lit(400000.0)).alias("price_cap_400k"),
        )
    )


def q_array_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").cast("bigint").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 5)
            .alias("first_component"),
            F.round(
                F.sqrt(F.aggregate(
                    "embedding", F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))),
                4).alias("l2_norm"),
        )
    )


def q_json_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        )
    )


# ---------------------------------------------------------------------------
# Subqueries / CTE / views
# ---------------------------------------------------------------------------


def q_cte(spark, sf_dir):
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql("""
        WITH cust_totals AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_mktsegment,
               count(*) AS n_big_customers,
               round(sum(ct.total), 2) AS segment_total
        FROM cust_totals ct JOIN customer c ON ct.o_custkey = c.c_custkey
        WHERE ct.total > 150000
        GROUP BY c.c_mktsegment
    """)


def q_scalar_subquery(spark, sf_dir):
    register_views(spark, sf_dir, ["orders"])
    return spark.sql("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """)


def q_in_subquery(spark, sf_dir):
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql("""
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """)


def q_exists_correlated(spark, sf_dir):
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """)


# ---------------------------------------------------------------------------
# UDF tiers (Arrow-vectorized — the sanctioned slow path)
# ---------------------------------------------------------------------------


def q_pandas_udf_scalar(spark, sf_dir):
    @F.pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_linenumber",
            # 2+2+2-decimal product: 6 native decimals, round there (no ties)
            F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6)
            .alias("charge"),
        )
    )


def q_grouped_map_zscore(spark, sf_dir):
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["l_quantity"].std(ddof=1)
        pdf["z"] = ((pdf["l_quantity"] - pdf["l_quantity"].mean()) / std).round(4)
        return pdf[["l_orderkey", "l_linenumber", "l_returnflag", "z"]]

    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .applyInPandas(
            zscore,
            "l_orderkey bigint, l_linenumber int, l_returnflag string, z double",
        )
    )


def q_sessionization(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via lag + running sum."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # INTEGER microseconds on both engines: a whole-second cast here vs
    # DuckDB's fractional epoch() made the >30min test diverge for any
    # gap inside (1800, 1801)s depending on the endpoints' sub-second
    # parts — exact integer comparison closes that window
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_gap = ev.withColumn(
        "new_session",
        F.when(epoch_us - F.lag(epoch_us).over(w) > 1_800_000_000, 1)
        .otherwise(0),
    )
    with_session = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
    )
    return (
        with_session.groupBy("user_id")
        .agg((F.max("session_id") + 1).cast("bigint").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "flagship": q_flagship,
    "scan_filter_project": q_scan_filter_project,
    "filter_compound": q_filter_compound,
    "join_inner": q_join_inner,
    "join_left": q_join_left,
    "join_right": q_join_right,
    "join_full": q_join_full,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_theta": q_join_theta,
    "join_range": q_join_range,
    "join_broadcast": q_join_broadcast,
    "join_asof": q_join_asof,
    "tpch_q1": q_tpch_q1,
    "agg_having": q_agg_having,
    "distinct": q_distinct,
    "count_distinct": q_count_distinct,
    "approx_count_distinct": q_approx_count_distinct,
    "rollup": q_rollup,
    "cube": q_cube,
    "grouping_sets": q_grouping_sets,
    "agg_stats": q_agg_stats,
    "pivot": q_pivot,
    "window_rank": q_window_rank,
    "window_running": q_window_running,
    "window_lag_lead": q_window_lag_lead,
    "window_range_frame": q_window_range_frame,
    "topk_per_group": q_topk_per_group,
    "topk_global": q_topk_global,
    "union_all": q_union_all,
    "union_distinct": q_union_distinct,
    "intersect": q_intersect,
    "except": q_except,
    "string_funcs": q_string_funcs,
    "date_funcs": q_date_funcs,
    "math_funcs": q_math_funcs,
    "conditional": q_conditional,
    "array_funcs": q_array_funcs,
    "json_funcs": q_json_funcs,
    "cte": q_cte,
    "scalar_subquery": q_scalar_subquery,
    "in_subquery": q_in_subquery,
    "exists_correlated": q_exists_correlated,
    "pandas_udf_scalar": q_pandas_udf_scalar,
    "grouped_map_zscore": q_grouped_map_zscore,
    "sessionization": q_sessionization,
}

ORACLES = {
    "flagship": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        FROM orders WHERE o_totalprice < 5000
        ORDER BY o_orderkey LIMIT 25
    """,
    "scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount > 0.03
    """,
    "filter_compound": """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE (o_orderstatus = 'O' AND o_totalprice BETWEEN 1000 AND 20000)
           OR (o_orderpriority LIKE '1-%' AND o_custkey NOT IN (1, 2, 3))
    """,
    "join_inner": """
        SELECT c_mktsegment,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "join_left": """
        SELECT c_custkey,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_right": """
        SELECT c_nationkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    "join_full": """
        SELECT coalesce(n_nationkey, s_nationkey) AS nk, n_name,
               CAST(count(s_suppkey) AS BIGINT) AS n_suppliers
        FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
        GROUP BY 1, 2
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "join_anti": """
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "join_theta": """
        SELECT r_regionkey, count(*) AS n_pairs
        FROM part JOIN region ON p_size > r_regionkey * 10
        GROUP BY r_regionkey
    """,
    "join_range": """
        SELECT o_orderpriority, count(*) AS n_shipped_30d,
               round(sum(l_quantity), 2) AS qty_30d
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        GROUP BY o_orderpriority
    """,
    "join_broadcast": """
        SELECT n_name, count(*) AS n_suppliers,
               round(avg(s_acctbal), 2) AS avg_bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "join_asof": """
        SELECT event_id, user_id, ts, last_click_ts FROM (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'click' THEN ts END
                              IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_click_ts
            FROM events WHERE event_type IN ('click', 'error')
        ) WHERE event_type = 'error'
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_having": """
        SELECT o_custkey, round(sum(o_totalprice), 2) AS total, count(*) AS n
        FROM orders GROUP BY o_custkey
        HAVING round(sum(o_totalprice), 2) > 300000
    """,
    "distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "count_distinct": """
        SELECT o_orderpriority,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    "approx_count_distinct": """
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_tol
        FROM lineitem GROUP BY l_returnflag
    """,
    "rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube": """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total, count(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "agg_stats": """
        SELECT l_returnflag,
               round(min(l_quantity), 2) AS min_qty,
               round(max(l_quantity), 2) AS max_qty,
               round(avg(l_quantity), 4) AS avg_qty,
               round(stddev_samp(l_quantity), 4) AS std_qty,
               round(var_samp(l_quantity), 4) AS var_qty,
               round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    "pivot": """
        SELECT l_returnflag,
               round(coalesce(sum(CASE WHEN l_linestatus = 'F'
                                       THEN l_quantity END), 0), 2) AS qty_f,
               round(coalesce(sum(CASE WHEN l_linestatus = 'O'
                                       THEN l_quantity END), 0), 2) AS qty_o
        FROM lineitem GROUP BY l_returnflag
    """,
    "window_rank": """
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER w AS rn,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        ) WHERE rn <= 5
    """,
    "window_running": """
        SELECT o_orderkey, o_custkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS run_total
        FROM orders
    """,
    "window_lag_lead": """
        SELECT event_id, user_id,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "window_range_frame": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
               round(sum(l_extendedprice) OVER (
                   PARTITION BY l_returnflag ORDER BY l_quantity
                   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS frame_sum
        FROM lineitem
    """,
    "topk_per_group": """
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey ASC)
                   AS rn
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rn <= 3
    """,
    "topk_global": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "union_all": """
        SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
    """,
    "union_distinct": """
        SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        UNION
        SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
    """,
    "intersect": """
        SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        INTERSECT
        SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
    """,
    "except": """
        SELECT CAST(n_nationkey AS INT) AS nk FROM nation
        EXCEPT
        SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        WHERE s_suppkey <= 10
    """,
    "string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               lower(p_brand) AS brand_lower,
               CAST(length(p_name) AS BIGINT) AS name_len,
               substring(p_name, 1, 5) AS name_pfx,
               concat_ws('-', p_brand, p_type) AS brand_type,
               replace(p_type, ' ', '_') AS type_snake
        FROM part
    """,
    "date_funcs": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(day(o_orderdate) AS BIGINT) AS dom,
               date_trunc('month', o_orderdate) AS month_start,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS days_since_95
        FROM orders
    """,
    "math_funcs": """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * l_discount, 4) AS disc_amt,
               abs(l_quantity - 25) AS qty_dev,
               CAST(ceil(l_discount) AS BIGINT) AS disc_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               round(sqrt(l_extendedprice), 6) AS price_sqrt,
               round(ln(l_extendedprice), 6) AS price_ln,
               round(log10(l_extendedprice), 6) AS price_log10,
               round(pow(l_quantity, 2), 2) AS qty_sq,
               CAST(l_linenumber % 3 AS BIGINT) AS ln_mod3
        FROM lineitem
    """,
    "conditional": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'high'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'low' END AS tier,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
               greatest(o_totalprice, 1000) AS price_floor_1k,
               least(o_totalprice, 400000) AS price_cap_400k
        FROM orders
    """,
    "array_funcs": """
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               round(CAST(embedding[1] AS DOUBLE), 5) AS first_component,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4)
                   AS l2_norm
        FROM embeddings
    """,
    "json_funcs": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        FROM events
    """,
    "cte": """
        WITH cust_totals AS (
            SELECT o_custkey, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY o_custkey
        )
        SELECT c.c_mktsegment,
               count(*) AS n_big_customers,
               round(sum(ct.total), 2) AS segment_total
        FROM cust_totals ct JOIN customer c ON ct.o_custkey = c.c_custkey
        WHERE ct.total > 150000
        GROUP BY c.c_mktsegment
    """,
    "scalar_subquery": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
    "in_subquery": """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
    "exists_correlated": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    """,
    "pandas_udf_scalar": """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                   AS charge
        FROM lineitem
    """,
    "grouped_map_zscore": """
        SELECT l_orderkey, l_linenumber, l_returnflag,
               round((l_quantity - avg(l_quantity) OVER w)
                     / stddev_samp(l_quantity) OVER w, 4) AS z
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag)
    """,
    "sessionization": """
        SELECT user_id,
               CAST(max(session_id) + 1 AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id))
                            > 1800000000
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            )
        )
        GROUP BY user_id
    """,
}
