"""Multi-touch marketing attribution — last-touch, first-touch, and
linear credit over a bounded lookback window.

Reference parity: the reference's relational surface (delegated to
DataFusion, src/lib.rs:16-21) supplies the join/window machinery; the
models are the standard attribution trio every event pipeline reports:
each conversion's preceding touchpoints (same user, within a lookback
interval, capped at the most recent ``max_touches``) share the credit —
all of it to the last touch, all to the first touch within the window,
or 1/n each (linear).

Determinism contract: the candidate join is bounded and exact (user
equi-key + timestamp interval residual, the as-of-tolerance pattern);
ranks order by (ts, event_id) — total, so ROW_NUMBER is deterministic.
The ONLY fractional credit is linear's 1/n with n <= max_touches, so
the per-channel total is computed from exact integer (channel, n)
bucket counts through a FIXED max_touches-term expression
``c1/1 + c2/2 + ...`` — never an order-dependent SUM of doubles.

Scale posture: one equi-join on the user key whose fan-out the lookback
interval bounds (touches per user per window, not per history), one
rank window per conversion, then hash aggregates. At 100 TB the
shuffle key is the user id; no global sorts, no cross joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def attribution_credits(touches: DataFrame, conversions: DataFrame,
                        user_col: str, ts_col: str, id_col: str,
                        channel_col: str, lookback_days: int,
                        max_touches: int) -> DataFrame:
    """Per-channel credit under the three standard models. ``touches``
    carries (user, ts, id, channel); ``conversions`` (user, ts, id).
    Returns (channel, last_touch, first_touch, linear_credit) where the
    integer columns count conversions credited and linear_credit is the
    fixed-expression sum of 1/n shares. First touch = the OLDEST touch
    inside the (lookback, cap) attribution window — the standard
    windowed reading."""
    if not 1 <= max_touches <= 10:
        raise ValueError(f"max_touches must be 1..10, got {max_touches}")
    c = conversions.select(F.col(user_col).alias("u"),
                           F.col(ts_col).alias("cts"),
                           F.col(id_col).alias("cid"))
    t = touches.select(F.col(user_col).alias("u"),
                       F.col(ts_col).alias("ts"),
                       F.col(id_col).alias("tid"),
                       F.col(channel_col).alias("channel"))
    pairs = (t.join(c, "u")
             .filter((F.col("ts") < F.col("cts"))
                     & (F.col("ts") >= F.col("cts")
                        - F.expr(f"INTERVAL {lookback_days} DAY"))))
    w = Window.partitionBy("cid").orderBy(F.desc("ts"), F.desc("tid"))
    ranked = (pairs.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= max_touches)
              .withColumn("n", F.max("rn").over(
                  Window.partitionBy("cid"))))
    by_nk = (ranked.groupBy("channel", "n").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum((F.col("rn") == 1).cast("bigint")).alias("last_n"),
        F.sum((F.col("rn") == F.col("n")).cast("bigint"))
        .alias("first_n")))
    linear = None
    for k in range(1, max_touches + 1):
        term = (F.coalesce(F.sum(F.when(F.col("n") == k,
                                        F.col("cnt"))), F.lit(0))
                .cast("double") / F.lit(float(k)))
        linear = term if linear is None else linear + term
    return (by_nk.groupBy("channel")
            .agg(F.sum("last_n").alias("last_touch"),
                 F.sum("first_n").alias("first_touch"),
                 linear.alias("linear_credit")))


def attribution_credits_sql(touches_sql: str, conversions_sql: str,
                            user_col: str, ts_col: str, id_col: str,
                            channel_col: str, lookback_days: int,
                            max_touches: int) -> str:
    """DuckDB mirror of :func:`attribution_credits` — same window
    bounds, ranks, bucket counts, and the IDENTICAL fixed linear-credit
    expression shape."""
    if not 1 <= max_touches <= 10:
        raise ValueError(f"max_touches must be 1..10, got {max_touches}")
    terms = " + ".join(
        f"CAST(coalesce(sum(CASE WHEN n = {k} THEN cnt END), 0) "
        f"AS DOUBLE) / {float(k)!r}e0"
        for k in range(1, max_touches + 1))
    return f"""
        WITH c AS (SELECT {user_col} AS u, {ts_col} AS cts,
                          {id_col} AS cid
                   FROM ({conversions_sql})),
        t AS (SELECT {user_col} AS u, {ts_col} AS ts, {id_col} AS tid,
                     {channel_col} AS channel
              FROM ({touches_sql})),
        ranked AS (
            SELECT channel, cid, rn,
                   MAX(rn) OVER (PARTITION BY cid) AS n
            FROM (
                SELECT t.channel, c.cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.cid
                           ORDER BY t.ts DESC, t.tid DESC) AS rn
                FROM t JOIN c ON t.u = c.u
                WHERE t.ts < c.cts
                  AND t.ts >= c.cts - INTERVAL {lookback_days} DAY
            ) WHERE rn <= {max_touches}
        ),
        by_nk AS (
            SELECT channel, n, CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS last_n,
                   CAST(sum(CASE WHEN rn = n THEN 1 ELSE 0 END)
                        AS BIGINT) AS first_n
            FROM ranked GROUP BY channel, n
        )
        SELECT channel,
               CAST(sum(last_n) AS BIGINT) AS last_touch,
               CAST(sum(first_n) AS BIGINT) AS first_touch,
               {terms} AS linear_credit
        FROM by_nk GROUP BY channel
    """
