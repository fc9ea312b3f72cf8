"""Skyline (Pareto frontier) operator: rows not dominated on a
(minimize cost, maximize gain) pair of criteria.

B dominates A iff B.cost <= A.cost AND B.gain >= A.gain with at least one
strict. The naive formulation is a quadratic NOT EXISTS self-join (that IS
the DuckDB oracle); the distributed plan here is the classic two-level
skyline: bucket rows by a cost range, resolve domination inside each
bucket with ONE window pass, and resolve cross-bucket domination through
the per-bucket gain maxima — an aggregate of #buckets rows, so the only
unbounded-cardinality exchanges are the bucket window and the bucket-keyed
aggregate. No global sort of the data, no pairwise join.

Correctness of the decomposition: buckets are ordered by cost (bucket =
cost // width), so every row in a strictly lower bucket is strictly
cheaper, every potential dominator of A outside A's bucket lives in a
lower bucket, and within the bucket the cost-ordered window sees exactly
the cheaper/equal rows. Equal (cost, gain) duplicates do not dominate
each other (no strict inequality) — all frontier ties survive, matching
the NOT EXISTS oracle row-for-row.

The reference has no skyline surface; this exists for the analytics tier
(price/quality frontiers over catalog or eval-score data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pareto_frontier(df: DataFrame, id_col: str, cost_col: str,
                    gain_col: str, bucket_width: int = 1000) -> DataFrame:
    """(id, cost, gain) rows on the frontier: minimal cost, maximal gain.
    ``cost_col``/``gain_col`` must be integer-valued (exact window RANGE
    frames and exact cross-engine comparison; quantize floats first).
    Rows with NULL cost or gain are excluded up front — domination is
    undefined on unknowns, and leaving them in diverges between the two
    formulations (SQL's NULL comparisons make NOT EXISTS keep such rows,
    while the bucket join / window filter here would drop them).
    ``bucket_width`` trades bucket count against per-bucket skew — aim for
    ~10³–10⁴ buckets at scale so the bucket summary stays broadcastable.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cost_col).cast("bigint").alias("cost"),
        F.col(gain_col).cast("bigint").alias("gain"),
    ).filter(F.col("cost").isNotNull() & F.col("gain").isNotNull()
             ).withColumn("bucket", F.floor(F.col("cost") / F.lit(bucket_width)))

    in_bucket = Window.partitionBy("bucket").orderBy("cost")
    # all strictly-cheaper rows of the same bucket
    cheaper = in_bucket.rangeBetween(Window.unboundedPreceding, -1)
    # all equal-cost rows (RANGE peers), incl. self — self never wins the
    # strict > test, so no self-domination
    peers = in_bucket.rangeBetween(0, 0)
    scored = base.select(
        "id", "cost", "gain", "bucket",
        F.max("gain").over(cheaper).alias("_cheaper_max"),
        F.max("gain").over(peers).alias("_peer_max"),
    )

    # per-bucket gain maxima -> prefix max over strictly lower buckets.
    # #buckets rows: the single-partition window runs over aggregated,
    # bounded data (the same contract as a global rollup).
    bucket_max = base.groupBy("bucket").agg(F.max("gain").alias("_bmax"))
    prev_bucket = (Window.orderBy("bucket")
                   .rowsBetween(Window.unboundedPreceding, -1))
    prefix = bucket_max.select(
        "bucket", F.max("_bmax").over(prev_bucket).alias("_prev_bucket_max"))

    dominated_cheaper = (
        F.greatest(F.col("_cheaper_max"), F.col("_prev_bucket_max"))
        >= F.col("gain"))
    dominated_peer = F.col("_peer_max") > F.col("gain")
    return (
        scored.join(F.broadcast(prefix), "bucket")
        .filter(~(F.coalesce(dominated_cheaper, F.lit(False))
                  | dominated_peer))
        .select("id", "cost", "gain")
    )


def pareto_frontier_sql(source_sql: str, id_col: str, cost_col: str,
                        gain_col: str) -> str:
    """DuckDB oracle: the quadratic NOT EXISTS definition — a different
    formulation on purpose, so a hash match proves the bucket/window
    decomposition, not just the same algebra twice."""
    return f"""
    WITH pts AS (
        SELECT {id_col} AS id, CAST({cost_col} AS BIGINT) AS cost,
               CAST({gain_col} AS BIGINT) AS gain
        FROM {source_sql}
        WHERE {cost_col} IS NOT NULL AND {gain_col} IS NOT NULL
    )
    SELECT id, cost, gain FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.cost <= a.cost AND b.gain >= a.gain
          AND (b.cost < a.cost OR b.gain > a.gain)
    )
    """
