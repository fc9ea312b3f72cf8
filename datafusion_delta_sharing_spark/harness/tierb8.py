"""Tier-B batch 8: exact ordered-set aggregates.

Exact interpolated percentiles (``percentile`` — the non-sketch
counterpart of ``approx_percentile``, hash-checkable because both engines
use the rank = q·(n−1) linear interpolation and the probe quantiles are
binary-exact multiples of 0.25) and ordered string aggregation (listagg:
``sort_array ∘ collect_list``, deterministic where a bare collect_list is
not). collect_list is bounded-group by contract — nations per region here;
at scale pair it with an explicit top-N cut first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table

_QS = (0.25, 0.5, 0.75)
_QS_SQL = ", ".join(str(q) for q in _QS)  # ONE spelling for both engines


def q_exact_percentiles(spark, sf_dir):
    """Exact quartiles of l_quantity per return flag — the workload where
    a 100 TB engine needs percentile_approx, shown exact here so the
    oracle can pin the interpolation arithmetic itself."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(CAST(l_quantity AS DOUBLE), array({_QS_SQL}))")
        .alias("_qs"))
    return agg.select(
        "l_returnflag",
        F.posexplode("_qs").alias("q_idx", "_qv"),
    ).select("l_returnflag", F.col("q_idx").cast("bigint").alias("q_idx"),
             F.round("_qv", 6).alias("q_value"))


def q_listagg_ordered(spark, sf_dir):
    """Per-region ordered nation roster: deterministic listagg via
    sort_array(collect_list(...)) + array_join."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), "|")
             .alias("nations"),
             F.count(F.lit(1)).alias("n_nations"))
    )


QUERIES = {
    "exact_percentiles": q_exact_percentiles,
    "listagg_ordered": q_listagg_ordered,
}

ORACLES = {
    "exact_percentiles": f"""
        SELECT l_returnflag, CAST(ord - 1 AS BIGINT) AS q_idx,
               round(q, 6) AS q_value
        FROM (SELECT l_returnflag, unnest(qs) AS q,
                     generate_subscripts(qs, 1) AS ord
              FROM (SELECT l_returnflag,
                           quantile_cont(CAST(l_quantity AS DOUBLE),
                                         [{_QS_SQL}])
                               AS qs
                    FROM lineitem GROUP BY l_returnflag))
    """,
    "listagg_ordered": """
        SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations,
               count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
}
