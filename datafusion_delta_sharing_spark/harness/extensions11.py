"""Extensions batch 11 (r7): interval algebra, graph BFS, distribution
shape, and SQL-surface coverage.

* ``interval_merge`` — per-user merged activity coverage (the
  gaps-and-islands rewrite of overlapping-interval union;
  :func:`..operators.intervals.merge_intervals`).
* ``asof_tolerance`` — forward as-of join with a staleness bound: each
  error event matched to the NEXT purchase by the same user within 15
  minutes (equi-join on user + bounded range residual + min-aggregate;
  the tolerance keeps the fan-out bounded at any history length, which
  is what makes forward as-of scale where an unbounded next-event join
  cannot).
* ``higher_moments`` — population skewness/excess-kurtosis per group
  via explicit central-moment SQL shared verbatim by both engines, plus
  an in-plan cross-check that Spark's ``skewness``/``kurtosis`` builtins
  agree with the formula (the hll_rollup bounded-check pattern).
* ``mode_rollup`` — deterministic per-group mode (count + row_number
  with an explicit value tie-break — Spark's ``mode()`` builtin is
  nondeterministic on ties, so the composition IS the operator).
* ``within_group_percentiles`` — ``PERCENTILE_CONT/DISC WITHIN GROUP``
  ordered-set aggregates (SQL:2003 inverse distribution; engine-shared
  spelling).
* ``bfs_hops`` — multi-source breadth-first search over the part
  co-occurrence graph (level-synchronous frontier joins;
  :func:`..operators.graph.bfs_hop_counts`).
* ``zipf_fit`` — log-log regression of token frequency on rank (the
  Zipf exponent of the corpus — a one-look corpus health check; real
  corpora fit ≈ −1, synthetic/degenerate vocabularies fit flat).
* ``stream_topk`` — streaming hourly top-k event types: complete-mode
  windowed counts with per-micro-batch ranking in the sink
  (:func:`..streaming.windows.stream_hourly_topk`).
* ``hash_funcs`` — digest/encoding scalar functions (md5, sha2-256,
  base64) against DuckDB's independent implementations.
* ``param_sql`` — parameterized ``spark.sql`` with named parameter
  markers (Spark 3.4+ API surface; the literal-inlined oracle proves the
  binding reaches the plan).
* ``group_by_all`` — ``GROUP BY ALL`` resolution (both engines infer the
  non-aggregate select list).
* ``python_udtf_analyze`` — Spark 4 UDTF with a static ``analyze``
  method: the output schema (w0..w{n-1}) is derived from a constant
  argument at plan time — the polymorphic table-function surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import cents_sql
from datafusion_delta_sharing_spark.functions.text import WS_TOKEN_SPLIT
from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.operators import graph as GR
from datafusion_delta_sharing_spark.operators import intervals as IV
from datafusion_delta_sharing_spark.operators.tfidf import (
    token_rows, token_rows_sql)
from datafusion_delta_sharing_spark.streaming.windows import (
    stream_hourly_topk)

# -- interval merge ---------------------------------------------------------

_IVL_DUR_US = 600_000_000  # each event opens a 10-minute activity interval


def q_interval_merge(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("s"),
        (F.expr("unix_micros(cast(ts as timestamp))")
         + F.lit(_IVL_DUR_US)).alias("e"))
    return IV.merge_intervals(iv, "user_id", "s", "e")


_IVL_SRC_SQL = f"""(
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS s,
           CAST(epoch_us(ts) + {_IVL_DUR_US} AS BIGINT) AS e
    FROM events
)"""

# -- forward as-of with tolerance -------------------------------------------

_ASOF_TOL = "15 minutes"


def q_asof_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    err = (ev.filter(F.col("event_type") == "error")
           .select("event_id", "user_id", "ts"))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select(F.col("user_id").alias("p_user"),
                   F.col("ts").alias("p_ts")))
    joined = err.join(
        pur,
        (err.user_id == pur.p_user)
        & (pur.p_ts > err.ts)
        & (pur.p_ts <= err.ts + F.expr(f"INTERVAL {_ASOF_TOL}")),
        "left")
    return (joined.groupBy("event_id", "user_id", "ts")
            .agg(F.min("p_ts").alias("next_purchase_ts")))


# -- distribution shape ------------------------------------------------------

# ONE spelling of the central-moment arithmetic for both engines:
# population skewness g1 = m3/m2^1.5, excess kurtosis g2 = m4/m2^2 - 3.
_MOMENTS_CORE = """
    SELECT e.event_type,
           CAST(max(g.n) AS BIGINT) AS n,
           round(max(g.mean), 6) AS mean,
           round(avg(power(e.value - g.mean, 2)), 6) AS m2,
           round(avg(power(e.value - g.mean, 3))
                 / power(avg(power(e.value - g.mean, 2)), 1.5), 6) AS skew,
           round(avg(power(e.value - g.mean, 4))
                 / power(avg(power(e.value - g.mean, 2)), 2) - 3, 6) AS kurt
    FROM events e
    JOIN (SELECT event_type, count(*) AS n, avg(value) AS mean
          FROM events GROUP BY event_type) g
      ON e.event_type = g.event_type
    GROUP BY e.event_type
"""


def q_higher_moments(spark, sf_dir):
    """Moment formulas shared verbatim with the oracle, PLUS an in-plan
    check that Spark's skewness/kurtosis builtins match the explicit
    formula within 1e-6 — if either builtin's definition drifts from
    population g1/g2, builtin_ok flips and the hash mismatches."""
    register_views(spark, sf_dir, ["events"])
    formula = spark.sql(_MOMENTS_CORE)
    builtin = (load_table(spark, sf_dir, "events")
               .groupBy("event_type")
               .agg(F.skewness("value").alias("b_skew"),
                    F.kurtosis("value").alias("b_kurt")))
    ok = ((F.abs(F.col("skew") - F.col("b_skew")) <= 1e-6)
          & (F.abs(F.col("kurt") - F.col("b_kurt")) <= 1e-6))
    return (formula.join(F.broadcast(builtin), "event_type")
            .select("event_type", "n", "mean", "m2", "skew", "kurt",
                    ok.alias("builtin_ok")))


# -- deterministic mode -------------------------------------------------------

_MODE_SQL = """
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(n AS BIGINT) AS n
    FROM (
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY count(*) DESC, o_orderpriority
               ) AS rn
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
"""


def q_mode_rollup(spark, sf_dir):
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_MODE_SQL)


# -- ordered-set aggregates ---------------------------------------------------

_WG_PCT_SQL = """
    SELECT event_type,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
               AS p50_cont,
           round(percentile_disc(0.25) WITHIN GROUP (ORDER BY value), 6)
               AS p25_disc,
           round(percentile_disc(0.75) WITHIN GROUP (ORDER BY value), 6)
               AS p75_disc
    FROM events GROUP BY event_type
"""


def q_within_group_percentiles(spark, sf_dir):
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_WG_PCT_SQL)


# -- graph BFS ----------------------------------------------------------------

_BFS_ORDERS = 2000   # same co-occurrence subgraph as triangles/pagerank
_BFS_SEED_MOD = 17   # seeds: parts with partkey % 17 == 0 in the subgraph
_BFS_HOPS = 3


def q_bfs_hops(spark, sf_dir):
    """Multi-source BFS hop histogram over the part co-occurrence graph.

    The ``l_orderkey < _BFS_ORDERS`` pin is LOAD-BEARING, not an
    optimization target (VERDICT r7 audit note): the synthetic corpus'
    co-occurrence graph is near-COMPLETE (every part co-occurs with most
    others), so an unpinned edge list grows quadratically in parts and
    says nothing a real sparse graph would — the same degenerate-
    vocabulary issue as the posting-list self-joins. Growth is covered
    by the sf1 probe (1.39×, SCALING.md); the operator itself
    (:func:`..operators.graph.bfs_hop_counts`) is linear in edges per
    hop on any graph."""
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") < _BFS_ORDERS))
    edges = GR.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    seeds = (li.filter(F.col("l_partkey") % _BFS_SEED_MOD == 0)
             .select(F.col("l_partkey").alias("v")).distinct())
    return GR.bfs_hop_counts(edges, seeds, _BFS_HOPS)


_BFS_ITEMS_SQL = (f"SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
                  f"WHERE l_orderkey < {_BFS_ORDERS}")
_BFS_EDGES_SQL = f"""
    SELECT DISTINCT l.l_partkey AS a, r.l_partkey AS b
    FROM ({_BFS_ITEMS_SQL}) l
    JOIN ({_BFS_ITEMS_SQL}) r
      ON l.l_orderkey = r.l_orderkey AND l.l_partkey < r.l_partkey
"""
_BFS_SEEDS_SQL = (f"SELECT DISTINCT l_partkey AS v FROM lineitem "
                  f"WHERE l_orderkey < {_BFS_ORDERS} "
                  f"AND l_partkey % {_BFS_SEED_MOD} = 0")

# -- Zipf fit -----------------------------------------------------------------


def q_zipf_fit(spark, sf_dir):
    """ln(freq) ~ ln(rank) least-squares over the corpus vocabulary.
    The rank window is global but VOCABULARY-sized (the token groupBy
    reduced the corpus first), so the single-partition sort is bounded
    by distinct-token count, not corpus rows."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    freq = (token_rows(docs, "text", "doc_id")
            .groupBy("token").agg(F.count(F.lit(1)).alias("n")))
    ranked = freq.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("n"), "token")))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.round(F.expr("regr_slope(ln(n), ln(r))"), 4).alias("slope"),
        F.round(F.expr("regr_intercept(ln(n), ln(r))"), 4)
        .alias("intercept"),
        F.round(F.expr("regr_r2(ln(n), ln(r))"), 6).alias("r2"))


# -- streaming top-k ----------------------------------------------------------

_TOPK_K = 3


def q_stream_topk(spark, sf_dir):
    return stream_hourly_topk(spark, sf_dir, k=_TOPK_K)


# -- scalar digest functions --------------------------------------------------


def q_hash_funcs(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("md5_hex"),
        F.sha2(F.col("c_name"), 256).alias("sha256_hex"),
        F.base64(F.encode("c_name", "UTF-8")).alias("b64"))


# -- parameterized SQL --------------------------------------------------------

_PARAM_MIN_BAL = 5000.0


def q_param_sql(spark, sf_dir):
    """Named parameter markers (Spark 3.4+ parameterized spark.sql): the
    binding must reach the plan — the oracle inlines the same literal."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        f"""
        SELECT c_mktsegment,
               count(*) AS n_cust,
               CAST(sum({cents_sql('c_acctbal')}) AS BIGINT)
                   AS total_bal_cents
        FROM customer WHERE c_acctbal > :min_bal
        GROUP BY c_mktsegment
        """,
        args={"min_bal": _PARAM_MIN_BAL})


# -- GROUP BY ALL -------------------------------------------------------------

_GBA_SQL = """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ALL
"""


def q_group_by_all(spark, sf_dir):
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_GBA_SQL)


# -- UDTF with analyze --------------------------------------------------------

_UDTF_NCOLS = 3


def q_python_udtf_analyze(spark, sf_dir):
    """Spark 4 polymorphic UDTF: ``analyze`` derives the output schema
    (w0..w{n-1}) from the constant n_cols argument at plan time — the
    table-function surface where the schema is data-dependent. Splitting
    uses the shared WS_TOKEN_SPLIT class so the oracle's
    regexp_split_to_array cannot drift."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitCols:
        @staticmethod
        def analyze(text: AnalyzeArgument,
                    n_cols: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n_cols.value, int) or n_cols.value < 1:
                raise ValueError(
                    "split_cols: n_cols must be a constant positive int")
            return AnalyzeResult(StructType([
                StructField(f"w{i}", StringType())
                for i in range(n_cols.value)]))

        def eval(self, text, n_cols):
            if text is None:
                return
            import re

            words = [w for w in re.split(WS_TOKEN_SPLIT, text) if w]
            yield tuple(words[i] if i < len(words) else None
                        for i in range(n_cols))

    spark.udtf.register("split_cols", udtf(SplitCols))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents")
    return spark.sql(f"""
        SELECT t.doc_id, s.*
        FROM documents t, LATERAL split_cols(t.text, {_UDTF_NCOLS}) s
        WHERE t.doc_id < 500
    """)


QUERIES = {
    "interval_merge": q_interval_merge,
    "asof_tolerance": q_asof_tolerance,
    "higher_moments": q_higher_moments,
    "mode_rollup": q_mode_rollup,
    "within_group_percentiles": q_within_group_percentiles,
    "bfs_hops": q_bfs_hops,
    "zipf_fit": q_zipf_fit,
    "stream_topk": q_stream_topk,
    "hash_funcs": q_hash_funcs,
    "param_sql": q_param_sql,
    "group_by_all": q_group_by_all,
    "python_udtf_analyze": q_python_udtf_analyze,
}

_TOK_SQL = token_rows_sql("documents", "text", "doc_id")

ORACLES = {
    "interval_merge": IV.merge_intervals_sql(
        _IVL_SRC_SQL, "user_id", "s", "e"),
    "asof_tolerance": """
        SELECT e.event_id, e.user_id, e.ts, min(p.ts) AS next_purchase_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
        LEFT JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = 'purchase') p
          ON p.user_id = e.user_id
         AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 15 MINUTE
        GROUP BY e.event_id, e.user_id, e.ts
    """,
    "higher_moments": f"""
        SELECT event_type, n, mean, m2, skew, kurt, TRUE AS builtin_ok
        FROM ({_MOMENTS_CORE})
    """,
    "mode_rollup": _MODE_SQL,
    "within_group_percentiles": _WG_PCT_SQL,
    "bfs_hops": GR.bfs_hop_counts_sql(
        _BFS_EDGES_SQL, _BFS_SEEDS_SQL, _BFS_HOPS),
    "zipf_fit": f"""
        WITH freq AS (
            SELECT token, count(*) AS n FROM ({_TOK_SQL}) GROUP BY token
        ), ranked AS (
            SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r
            FROM freq
        )
        SELECT CAST(count(*) AS BIGINT) AS n_vocab,
               round(regr_slope(ln(n), ln(r)), 4) AS slope,
               round(regr_intercept(ln(n), ln(r)), 4) AS intercept,
               round(regr_r2(ln(n), ln(r)), 6) AS r2
        FROM ranked
    """,
    "stream_topk": f"""
        SELECT window_start, event_type, CAST(n AS BIGINT) AS n,
               CAST(rank AS INT) AS rank
        FROM (
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n,
                   row_number() OVER (
                       PARTITION BY date_trunc('hour', ts)
                       ORDER BY count(*) DESC, event_type
                   ) AS rank
            FROM events GROUP BY 1, 2
        ) WHERE rank <= {_TOPK_K}
    """,
    "hash_funcs": """
        SELECT c_custkey, md5(c_name) AS md5_hex,
               sha256(c_name) AS sha256_hex,
               to_base64(encode(c_name)) AS b64
        FROM customer
    """,
    "param_sql": f"""
        SELECT c_mktsegment,
               count(*) AS n_cust,
               CAST(sum({cents_sql('c_acctbal')}) AS BIGINT)
                   AS total_bal_cents
        FROM customer WHERE c_acctbal > {_PARAM_MIN_BAL}
        GROUP BY c_mktsegment
    """,
    "group_by_all": _GBA_SQL,
    "python_udtf_analyze": f"""
        SELECT doc_id, words[1] AS w0, words[2] AS w1, words[3] AS w2
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(text,
                                 '{WS_TOKEN_SPLIT}'), x -> x != '')
                         AS words
              FROM documents WHERE doc_id < 500 AND text IS NOT NULL)
    """,
}
