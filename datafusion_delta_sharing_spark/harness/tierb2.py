"""Tier-B batch 2: analytic windows, statistical aggregates, lateral
explode, map functions, unpivot, multiset set-ops, Python UDTF, stateful
streaming. Same comparability conventions as tierb.py."""

from __future__ import annotations

from pyspark.sql import functions as F, Window as W

from datafusion_delta_sharing_spark.functions import money as MONEY
from datafusion_delta_sharing_spark.functions.text import WS_TOKEN_SPLIT, words_of
from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.streaming.stateful import stateful_user_totals


def q_window_analytics(spark, sf_dir):
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_orderpriority",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.first("o_orderkey").over(wfull).alias("cheapest_key"),
            F.last("o_orderkey").over(wfull).alias("priciest_key"),
        )
    )


def q_agg_corr(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("cov_s"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("cov_p"),
        )
    )


def q_explode_lateral(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    # words_of filters '' fragments exactly like the oracle's list_filter —
    # a raw split keeps phantom tokens for edge tabs/newlines that trim()
    # (space-only) does not strip
    words = words_of("text")
    return (
        docs.select("doc_id", F.posexplode(words).alias("pos", "word"))
        .withColumn("pos", (F.col("pos") + 1).cast("bigint"))  # 1-based like unnest
    )


def q_map_funcs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("chars"), F.col("n_chars").cast("long"),
        F.lit("id"), F.col("doc_id"),
    )
    return docs.select(
        "doc_id",
        F.element_at(m, "chars").alias("chars_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_sorted"),
    )


def q_unpivot(spark, sf_dir):
    wide = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("price"))
    )
    return wide.unpivot(
        ids=["l_returnflag"], values=["qty", "price"],
        variableColumnName="measure", valueColumnName="val",
    )


def q_except_all(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") <= 10).select(
        F.col("l_orderkey").alias("k"))
    b = li.filter(F.col("l_quantity") <= 5).select(
        F.col("l_orderkey").alias("k"))
    return a.exceptAll(b)


def q_python_udtf(spark, sf_dir):
    """Spark 4 Python UDTF: explode each document into (doc_id, word) rows
    for short docs — table-function surface the reference exposes only
    through SQL; oracle is the unnest equivalent."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):
            # NULL-safe (the oracle's unnest silently skips NULL rows);
            # WS_TOKEN_SPLIT is an explicit class, so no re.ASCII needed —
            # Python str.split()/Unicode \s would split on U+3000/NBSP,
            # which the oracle keeps inside tokens (and ASCII \s includes
            # \x0b, which RE2's does not); '' fragments are filtered
            # instead of stripped so edge whitespace matches too
            if text is None:
                return
            import re

            for w in re.split(WS_TOKEN_SPLIT, text):
                if w:
                    yield (w,)

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql("""
        SELECT s.word AS w, t.doc_id AS d
        FROM documents t, LATERAL split_words(t.text) s
        WHERE t.doc_id < 10
    """)


def q_stateful_stream(spark, sf_dir):
    return stateful_user_totals(spark, sf_dir)


QUERIES = {
    "window_analytics": q_window_analytics,
    "agg_corr": q_agg_corr,
    "explode_lateral": q_explode_lateral,
    "map_funcs": q_map_funcs,
    "unpivot": q_unpivot,
    "except_all": q_except_all,
    "python_udtf": q_python_udtf,
    "stateful_stream": q_stateful_stream,
}

ORACLES = {
    "window_analytics": """
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               first_value(o_orderkey) OVER wfull AS cheapest_key,
               last_value(o_orderkey) OVER wfull AS priciest_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey),
               wfull AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)
    """,
    "agg_corr": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
               round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p
        FROM lineitem GROUP BY l_returnflag
    """,
    "explode_lateral": f"""
        SELECT doc_id,
               unnest(range(1, len(list_filter(regexp_split_to_array(trim(text), '{WS_TOKEN_SPLIT}'), x -> x != '')) + 1))
                   AS pos,
               unnest(list_filter(regexp_split_to_array(trim(text), '{WS_TOKEN_SPLIT}'), x -> x != '')) AS word
        FROM documents WHERE doc_id < 20
    """,
    "map_funcs": """
        SELECT doc_id,
               -- chars_val == n_chars by construction; spelled directly
               -- because map-extraction syntax is the one DuckDB idiom
               -- whose return shape changed across versions (LIST in 1.0,
               -- scalar later) — the Spark side still exercises element_at
               CAST(n_chars AS BIGINT) AS chars_val,
               CAST(cardinality(map(['chars','id'], [n_chars, doc_id]))
                    AS BIGINT) AS n_keys,
               array_to_string(list_sort(map_keys(
                    map(['chars','id'], [n_chars, doc_id]))), ',') AS keys_sorted
        FROM documents
    """,
    "unpivot": """
        WITH wide AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 2) AS qty,
                   round(sum(l_extendedprice), 2) AS price
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty' AS measure, qty AS val FROM wide
        UNION ALL
        SELECT l_returnflag, 'price' AS measure, price AS val FROM wide
    """,
    "except_all": """
        SELECT l_orderkey AS k FROM lineitem WHERE l_quantity <= 10
        EXCEPT ALL
        SELECT l_orderkey AS k FROM lineitem WHERE l_quantity <= 5
    """,
    "python_udtf": f"""
        SELECT unnest(list_filter(regexp_split_to_array(trim(text), '{WS_TOKEN_SPLIT}'), x -> x != '')) AS w,
               doc_id AS d
        FROM documents WHERE doc_id < 10
    """,
    "stateful_stream": f"""
        SELECT user_id, count(*) AS n_events,
               CAST(sum({MONEY.cents_sql('value')}) AS DOUBLE)
                   / 100.0 AS total_value
        FROM events GROUP BY user_id
    """,
}
