"""Interval-overlap join via temporal bucketization.

Joining two interval sets on overlap (s1 < e2 AND s2 < e1) has no equi
key, so a naive plan is a broadcast-nested-loop or cartesian — quadratic
at scale. The scalable form buckets time into coarse grains, explodes
each interval over the grains it touches, equi-joins on the grain (hash
shuffle), dedups candidate pairs, and verifies the exact overlap
predicate. Grain size trades explode factor against join fan-out: pick
it near the median interval length so each interval touches O(1) grains.

The DuckDB oracle is deliberately the NAIVE quadratic theta join — same
semantics, different plan — so the hash check proves the bucketed
rewrite loses and invents nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          id_col: str, start_col: str, end_col: str,
                          grain_us: int) -> DataFrame:
    """(l_id, r_id, overlap_us) for half-open [start, end) interval pairs
    (left id < right id to emit each unordered pair once). start/end are
    BIGINT microseconds.

    Contract: ``id_col`` uniquely identifies rows. Duplicate (id, s, e)
    rows would be collapsed by the candidate ``distinct()`` here while the
    naive quadratic oracle multiplies them — the same reason any keyed
    join needs a key.

    The grain sequence's upper end is clamped to its start: for a
    degenerate ([t, t)) or malformed (end < start) interval, an unclamped
    ``sequence(hi, lo)`` silently DESCENDS, exploding one bad row over the
    whole grain range. Clamping emits exactly one grain for such rows and
    stays a candidate superset: any partner that overlaps one (per the
    exact predicate, b.s < a.e <= a.s < b.e) must straddle a.s, hence
    covers floor(a.s/grain); two degenerate intervals can never satisfy
    the predicate with each other."""
    if grain_us <= 0:
        # grain 0 makes the floor-division NULL (sequence -> explode
        # drops every row: silently EMPTY), negative grains collapse
        # buckets and silently lose pairs
        raise ValueError(f"grain_us must be positive, got {grain_us}")

    def coded(df, side):
        start_g = (F.floor(F.col(f"{side}_s") / F.lit(grain_us))
                   .cast("long"))
        end_g = (F.floor((F.col(f"{side}_e") - 1) / F.lit(grain_us))
                 .cast("long"))
        return (df.select(F.col(id_col).alias(f"{side}_id"),
                          F.col(start_col).alias(f"{side}_s"),
                          F.col(end_col).alias(f"{side}_e"))
                .withColumn("g", F.explode(F.sequence(
                    start_g, F.greatest(end_g, start_g)))))

    cand = (coded(left, "l").join(coded(right, "r"), "g")
            .filter(F.col("l_id") < F.col("r_id"))
            .select("l_id", "l_s", "l_e", "r_id", "r_s", "r_e")
            .distinct())
    return (cand.filter((F.col("l_s") < F.col("r_e"))
                        & (F.col("r_s") < F.col("l_e")))
            .select("l_id", "r_id",
                    (F.least("l_e", "r_e")
                     - F.greatest("l_s", "r_s")).alias("overlap_us")))


def interval_overlap_join_sql(left_sql: str, right_sql: str, id_col: str,
                              start_col: str, end_col: str) -> str:
    """The naive quadratic mirror (correctness spec, not the scale plan)."""
    return f"""
    SELECT l.{id_col} AS l_id, r.{id_col} AS r_id,
           CAST(least(l.{end_col}, r.{end_col})
                - greatest(l.{start_col}, r.{start_col}) AS BIGINT)
               AS overlap_us
    FROM {left_sql} l JOIN {right_sql} r
      ON l.{id_col} < r.{id_col}
     AND l.{start_col} < r.{end_col}
     AND r.{start_col} < l.{end_col}
    """


def merge_intervals(df: DataFrame, key_col: str, start_col: str,
                    end_col: str) -> DataFrame:
    """Merge overlapping/touching half-open ``[start, end)`` intervals per
    key (the gaps-and-islands rewrite) and return per-key coverage:
    ``(key, n_intervals, n_islands, covered_us)``.

    The classic uses: user-activity coverage, sensor uptime, and the
    "how much wall-clock did these overlapping jobs actually occupy"
    rollup. The scalable shape is one shuffle on the key plus two window
    passes WITHIN the key partition (running max-end flags island starts,
    running sum numbers the islands) and two keyed aggregations — never a
    self-join, never a driver loop, so it holds at any key cardinality
    as long as a single key's intervals fit a partition (the same
    contract as any per-key window).

    Island rule: an interval starts a new island iff its start is
    STRICTLY greater than the running max end of all earlier intervals
    (ties on (start, end) are order-insensitive: equal starts always
    co-island since every interval is non-empty). ``covered_us`` sums
    ``max_end − min_start`` per island, counting overlapped time once.
    """
    s, e = F.col(start_col), F.col(end_col)
    order = [start_col, end_col]
    w_prev = (Window.partitionBy(key_col).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, -1))
    prev_max_e = F.max(e).over(w_prev)
    new_island = F.when(prev_max_e.isNull() | (s > prev_max_e),
                        1).otherwise(0)
    w_cum = (Window.partitionBy(key_col).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, 0))
    flagged = df.select(key_col, start_col, end_col,
                        new_island.alias("new_island"))
    numbered = flagged.withColumn(
        "island", F.sum("new_island").over(w_cum))
    islands = (numbered.groupBy(key_col, "island")
               .agg(F.min(start_col).alias("i_s"),
                    F.max(end_col).alias("i_e"),
                    F.count(F.lit(1)).alias("n_iv")))
    return (islands.groupBy(key_col)
            .agg(F.sum("n_iv").cast("long").alias("n_intervals"),
                 F.count(F.lit(1)).cast("long").alias("n_islands"),
                 F.sum(F.col("i_e") - F.col("i_s")).cast("long")
                 .alias("covered_us")))


def merge_intervals_sql(source_sql: str, key_col: str, start_col: str,
                        end_col: str) -> str:
    """Engine-shared SQL mirror of :func:`merge_intervals` (identical
    spelling runs on Spark and DuckDB — both support ROWS-framed running
    max/sum)."""
    return f"""
    WITH flagged AS (
        SELECT {key_col}, {start_col}, {end_col},
               CASE WHEN max({end_col}) OVER (
                        PARTITION BY {key_col}
                        ORDER BY {start_col}, {end_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR {start_col} > max({end_col}) OVER (
                        PARTITION BY {key_col}
                        ORDER BY {start_col}, {end_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) THEN 1 ELSE 0 END AS new_island
        FROM {source_sql}
    ), numbered AS (
        SELECT {key_col}, {start_col}, {end_col},
               sum(new_island) OVER (
                   PARTITION BY {key_col}
                   ORDER BY {start_col}, {end_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    ), islands AS (
        SELECT {key_col}, island,
               min({start_col}) AS i_s, max({end_col}) AS i_e,
               count(*) AS n_iv
        FROM numbered GROUP BY {key_col}, island
    )
    SELECT {key_col},
           CAST(sum(n_iv) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_e - i_s) AS BIGINT) AS covered_us
    FROM islands GROUP BY {key_col}
    """
