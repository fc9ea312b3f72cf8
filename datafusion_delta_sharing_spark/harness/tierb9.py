"""Tier-B batch 9: Spark 4 relational surface — recursive CTEs,
correlated LATERAL subqueries, and linear-regression aggregates.

* ``recursive_cte`` — ``WITH RECURSIVE`` landed in Spark 4 (the classic
  DataFusion/DuckDB-style recursion the reference inherits from its
  engine); exercised as a calendar-spine generation + zero-filled left
  join, the canonical reporting shape. The recursion generates a bounded
  literal month spine (84 rows — driver-sized by construction), so at
  100 TB the only corpus-sized work is the one aggregation over orders;
  the spine side broadcasts.
* ``lateral_topn`` — correlated LATERAL subquery with aggregation +
  ORDER BY + LIMIT (top-N per outer row). Catalyst decorrelates it into
  a join + per-group limit rather than re-executing per row; totals are
  integer cents so the ranking is engine-exact.
* ``regr_funcs`` — the SQL:2003 linear-regression aggregate family
  (regr_count/slope/intercept/r2/avgx/avgy), grouped. Slope/intercept
  are rounded to 4 digits (their moments accumulate in partition order;
  magnitudes run to 1e4 so 1e-4 absolute leaves ~8 safe orders of
  magnitude over the expected 1e-12 relative wobble), r2 and the means
  to 6 (bounded magnitude).
"""

from __future__ import annotations

from datafusion_delta_sharing_spark.functions.money import cents_sql
from datafusion_delta_sharing_spark.harness import register_views

# ONE spelling of the spine bounds and the per-month aggregate for both
# engines; only date arithmetic differs (add_months vs + INTERVAL).
_SPINE_LO = "1995-01-01"
_SPINE_HI = "2001-12-01"
_MONTH_AGG = f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           count(*) AS n_orders,
           sum({cents_sql('o_totalprice')}) AS total_cents
    FROM orders GROUP BY 1
"""


def q_recursive_cte(spark, sf_dir):
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(f"""
        WITH RECURSIVE months AS (
            SELECT DATE '{_SPINE_LO}' AS month_start
            UNION ALL
            SELECT add_months(month_start, 1) FROM months
            WHERE month_start < DATE '{_SPINE_HI}'
        )
        SELECT CAST(m.month_start AS TIMESTAMP_NTZ) AS month_start,
               CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(o.total_cents, 0) AS BIGINT) AS total_cents
        FROM months m LEFT JOIN ({_MONTH_AGG}) o USING (month_start)
    """)


_LATERAL = """
    SELECT r.r_name, top.n_name, top.total_bal_cents
    FROM region r,
    LATERAL (
        SELECT n.n_name, {total} AS total_bal_cents
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY total_bal_cents DESC, n_name
        LIMIT 2
    ) top
"""


def q_lateral_topn(spark, sf_dir):
    register_views(spark, sf_dir, ["region", "nation", "customer"])
    return spark.sql(
        _LATERAL.format(total=f"sum({cents_sql('c_acctbal')})"))


_REGR = """
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)
               AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           round(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
    FROM lineitem GROUP BY l_returnflag
"""


def q_regr_funcs(spark, sf_dir):
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_REGR)


QUERIES = {
    "recursive_cte": q_recursive_cte,
    "lateral_topn": q_lateral_topn,
    "regr_funcs": q_regr_funcs,
}

ORACLES = {
    "recursive_cte": f"""
        WITH RECURSIVE months AS (
            SELECT DATE '{_SPINE_LO}' AS month_start
            UNION ALL
            SELECT month_start + INTERVAL 1 MONTH FROM months
            WHERE month_start < DATE '{_SPINE_HI}'
        )
        SELECT CAST(m.month_start AS TIMESTAMP) AS month_start,
               CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(o.total_cents, 0) AS BIGINT) AS total_cents
        FROM months m LEFT JOIN ({_MONTH_AGG}) o USING (month_start)
    """,
    "lateral_topn": _LATERAL.format(
        total=f"CAST(sum({cents_sql('c_acctbal')}) AS BIGINT)"),
    "regr_funcs": _REGR,
}
