"""Extension queries batch 7: warehouse patterns.

SCD Type-2 dimension build (change log -> validity intervals), event
transition matrix (Markov next-event counts), and market-basket
association rules (pair support/confidence/lift). All built from window
and aggregate primitives; ties and ratios follow the repo's exactness
discipline — event-id tie-breaks inside window orderings, and lift is
carried as an exact integer cross-product (it is monotone in
n * c_ab / (c_a * c_b), no division materialized).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from datafusion_delta_sharing_spark.harness import load_table

_BASKET_ORDERS = 15000  # wider than the graph subset: pair support needs mass
_MIN_SUPPORT = 2        # sf0.01 baskets are sparse; 3k+ pairs clear this bar


def scd2_intervals(spark, sf_dir, user_bound: int = 100):
    """THE Spark-side SCD2 interval recipe — one definition for both
    halves of the workflow (q_scd2_build constructs, extensions13's
    q_scd2_lookup probes; r8 review: a second hand-rolled copy of the
    window spec could drift tie-break/null-ordering between them while
    each side's own oracle still passed). Each user's event stream
    becomes validity intervals [valid_from, valid_to) per observed
    event_type state, closed by the next state change (open interval =
    current). The window is per-user ordered by (ts, event_id) — total
    order, so the intervals are deterministic. NULLS LAST pinned
    explicitly: Spark defaults nulls first, DuckDB last, so a null
    ts/event_id (schema allows them) would otherwise land at opposite
    ends and shift every version for that user. The user_bound filter
    sits BELOW the window — equivalent (the window partitions by
    user_id) and it prunes before the shuffle."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("user_id") < user_bound)
          .select("user_id", "event_type", "ts", "event_id"))
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    return (ev.withColumn("valid_to", F.lead("ts").over(w))
            .withColumn("version", F.row_number().over(w))
            .select("user_id", "version",
                    F.col("event_type").alias("state"),
                    F.col("ts").alias("valid_from"), "valid_to"))


def q_scd2_build(spark, sf_dir):
    """Slowly-changing-dimension type 2 build: see
    :func:`scd2_intervals` (the shared recipe) for the semantics."""
    return scd2_intervals(spark, sf_dir).select(
        "user_id", "version", "state", "valid_from", "valid_to",
        F.col("valid_to").isNull().alias("is_current"))


_SCD2_SQL = """
    SELECT user_id, version, state, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM (
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               row_number() OVER w AS version
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts NULLS LAST, event_id NULLS LAST)
    )
    WHERE user_id < 100
"""


def q_event_transitions(spark, sf_dir):
    """Markov transition counts: (event_type -> next event_type) per user
    stream, plus terminal transitions to '<end>'. Null ordering pinned
    for the same reason as q_scd2_build."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    return (ev.withColumn("next_type",
                          F.coalesce(F.lead("event_type").over(w),
                                     F.lit("<end>")))
            .groupBy(F.col("event_type").alias("from_type"), "next_type")
            .agg(F.count(F.lit(1)).alias("n")))


_TRANSITIONS_SQL = """
    SELECT event_type AS from_type,
           coalesce(lead(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts NULLS LAST, event_id NULLS LAST),
                    '<end>') AS next_type
    FROM events
"""
_TRANSITIONS_SQL = f"""
    SELECT from_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM ({_TRANSITIONS_SQL})
    GROUP BY from_type, next_type
"""


def q_basket_rules(spark, sf_dir):
    """Association rules over order baskets: pair support plus the exact
    integer lift cross-products (lift = n_baskets*c_ab/(c_a*c_b); ranking
    and filtering use the integer numerator/denominator)."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < _BASKET_ORDERS))
    baskets = li.select(F.col("l_orderkey").alias("g"),
                        F.col("l_partkey").alias("i")).distinct()
    n_b = baskets.select("g").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets"))
    item = baskets.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select("g", F.col("i").alias("ia"))
    b = baskets.select("g", F.col("i").alias("ib"))
    pairs = (a.join(b, "g").filter(F.col("ia") < F.col("ib"))
             .groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("c_ab"))
             .filter(F.col("c_ab") >= _MIN_SUPPORT))
    ca = item.select(F.col("i").alias("ia"), F.col("c").alias("c_a"))
    cb = item.select(F.col("i").alias("ib"), F.col("c").alias("c_b"))
    return (pairs.join(ca, "ia").join(cb, "ib")
            .crossJoin(F.broadcast(n_b))
            .select("ia", "ib", "c_ab", "c_a", "c_b",
                    (F.col("c_ab") * F.col("n_baskets")).alias("lift_num"),
                    (F.col("c_a") * F.col("c_b")).alias("lift_den")))


_BASKET_SQL = f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS g, l_partkey AS i
        FROM lineitem WHERE l_orderkey < {_BASKET_ORDERS}
    ), nb AS (SELECT count(DISTINCT g) AS n_baskets FROM baskets),
    item AS (SELECT i, count(*) AS c FROM baskets GROUP BY i),
    pairs AS (
        SELECT a.i AS ia, b.i AS ib, count(*) AS c_ab
        FROM baskets a JOIN baskets b ON a.g = b.g AND a.i < b.i
        GROUP BY a.i, b.i
        HAVING count(*) >= {_MIN_SUPPORT}
    )
    SELECT p.ia, p.ib,
           CAST(p.c_ab AS BIGINT) AS c_ab,
           CAST(ca.c AS BIGINT) AS c_a,
           CAST(cb.c AS BIGINT) AS c_b,
           CAST(p.c_ab * nb.n_baskets AS BIGINT) AS lift_num,
           CAST(ca.c * cb.c AS BIGINT) AS lift_den
    FROM pairs p
    JOIN item ca ON ca.i = p.ia
    JOIN item cb ON cb.i = p.ib
    CROSS JOIN nb
"""


def q_rolling_wau(spark, sf_dir):
    """Trailing-7-day distinct active users per day. Distinct-count over a
    sliding window can't be expressed as a window function; the scalable
    form is (user, day) dedup -> day-spine range join over the trailing
    week -> per-day distinct count. Days are epoch-day integers so both
    engines bucket identically."""
    ev = load_table(spark, sf_dir, "events")
    # floor(a/b), not div: div truncates toward zero and would bucket
    # pre-1970 timestamps differently from DuckDB's flooring //
    acts = (ev.select("user_id",
                      F.floor(F.expr("unix_micros(cast(ts as timestamp))")
                              / F.lit(86_400_000_000)).cast("long")
                      .alias("day"))
            .distinct())
    days = acts.select("day").distinct()
    return (days.alias("d")
            .join(acts.alias("a"),
                  (F.col("a.day") >= F.col("d.day") - 6)
                  & (F.col("a.day") <= F.col("d.day")))
            .groupBy(F.col("d.day").alias("day"))
            .agg(F.countDistinct("a.user_id").alias("wau")))


_ROLLING_WAU_SQL = """
    WITH acts AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events
    ), days AS (SELECT DISTINCT day FROM acts)
    SELECT d.day AS day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
    FROM days d
    JOIN acts a ON a.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
"""


def q_label_index(spark, sf_dir):
    """Deterministic categorical encoding (StringIndexer analogue): each
    distinct label of lang and source maps to a dense sorted index."""
    docs = load_table(spark, sf_dir, "documents")
    out = None
    for col in ("lang", "source"):
        # explicit NULLS LAST: Spark defaults nulls first, DuckDB last —
        # a NULL label would silently shift every index between engines
        part = (docs.select(F.col(col).alias("label")).distinct()
                .withColumn("idx", F.dense_rank().over(
                    Window.orderBy(F.asc_nulls_last("label"))) - 1)
                .select(F.lit(col).alias("column_name"), "label", "idx"))
        out = part if out is None else out.unionByName(part)
    return out


_LABEL_INDEX_SQL = """
    SELECT 'lang' AS column_name, label,
           CAST(dense_rank() OVER (ORDER BY label NULLS LAST) - 1 AS BIGINT)
               AS idx
    FROM (SELECT DISTINCT lang AS label FROM documents)
    UNION ALL
    SELECT 'source', label,
           CAST(dense_rank() OVER (ORDER BY label NULLS LAST) - 1 AS BIGINT)
    FROM (SELECT DISTINCT source AS label FROM documents)
"""


QUERIES = {
    "scd2_build": q_scd2_build,
    "event_transitions": q_event_transitions,
    "basket_rules": q_basket_rules,
    "rolling_wau": q_rolling_wau,
    "label_index": q_label_index,
}

ORACLES = {
    "scd2_build": _SCD2_SQL,
    "event_transitions": _TRANSITIONS_SQL,
    "basket_rules": _BASKET_SQL,
    "rolling_wau": _ROLLING_WAU_SQL,
    "label_index": _LABEL_INDEX_SQL,
}
