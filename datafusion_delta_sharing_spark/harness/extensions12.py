"""Extensions batch 12 (late r7): exact bitmap distinct counts, sketch
top-k with an in-plan exactness check, ML featurization, and more SQL /
DataFrame API surface.

* ``bitmap_distinct`` — Spark 3.5 bitmap aggregates
  (``bitmap_bit_position`` / ``bitmap_construct_agg`` / ``bitmap_count``):
  EXACT distinct counts from fixed-width bitmap chunks — the mergeable
  exact-distinct primitive (HLL's exact sibling: per-bucket bitmaps OR
  together across days/partitions for free). The oracle is the plain
  ``count(DISTINCT ...)`` — bitmaps are exact, so no tolerance row.
* ``distinct_aggs`` — ``sum/avg/count(DISTINCT ...)`` + ``count_if``
  (engine-shared spelling; DISTINCT aggregates add an in-shuffle dedup
  that plain aggregates don't — worth its own driver row).
* ``approx_topk`` — Spark 4 ``approx_top_k`` sketch, checked in-plan
  against the exact GROUP BY top-k (the hll_rollup bounded-check
  pattern): the emitted rows are the EXACT top-3 with a boolean proving
  the sketch found the same (item, count) pairs.
* ``format_funcs`` — printf-style ``format_string``, hex/conv radix,
  repeat/reverse, char vs byte length, against DuckDB's C-style printf.
* ``feature_hashing`` — the hashing trick
  (:func:`..operators.tfidf.feature_hash_counts`): fixed-dim sparse
  bag-of-words with no vocabulary pass.
* ``observe_metrics`` — ``DataFrame.observe`` + ``Observation``: data-
  quality counters collected ON an existing pass (zero extra scans in
  production; here the noop-sink action IS the pass), returned as a
  one-row DataFrame the oracle recomputes from scratch.
* ``calendar_funcs`` — make_date / make_timestamp / last_day /
  dayofyear / quarter round-trips on the orders dates.
* ``aes_roundtrip`` — ``aes_encrypt``/``aes_decrypt`` (GCM): ciphertext
  is IV-random so the oracle checks the INVARIANTS — decrypt∘encrypt
  identity and the GCM framing overhead (12-byte IV + 16-byte tag) —
  plus the plaintext row values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import (
    cents_sql as _cents_sql)
from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.operators.tfidf import (
    feature_hash_counts, feature_hash_counts_sql)

# -- exact bitmap distinct ----------------------------------------------------

_BITMAP_SQL_SPARK = """
    SELECT event_type,
           CAST(sum(n_chunk) AS BIGINT) AS n_distinct
    FROM (
        SELECT event_type,
               bitmap_count(bitmap_construct_agg(
                   bitmap_bit_position(event_id))) AS n_chunk
        FROM events
        GROUP BY event_type, bitmap_bucket_number(event_id)
    ) GROUP BY event_type
"""


def q_bitmap_distinct(spark, sf_dir):
    """Exact distinct via bitmap chunks: group by (key, bucket) builds a
    fixed-width bitmap per 32768-id chunk; counts sum across chunks.
    Unlike count(DISTINCT) the per-chunk bitmaps are MERGEABLE state —
    the daily→monthly exact-distinct rollup without re-deduplicating."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_BITMAP_SQL_SPARK)


# -- DISTINCT aggregates + count_if ------------------------------------------

_DISTINCT_AGGS_SQL = """
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT) AS n_big,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(DISTINCT user_id) AS BIGINT) AS sum_users,
           round(avg(DISTINCT user_id), 6) AS avg_users
    FROM events GROUP BY event_type
"""


def q_distinct_aggs(spark, sf_dir):
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_DISTINCT_AGGS_SQL)


# -- approx_top_k with in-plan exactness check --------------------------------

_ATK_K = 3


def q_approx_topk(spark, sf_dir):
    """Spark 4 ``approx_top_k`` sketch vs the exact top-k: emitted rows
    are the EXACT top-3 event types (count desc, type tie-break); the
    sketch's (item, count) pairs are matched in-plan — ``sketch_ok``
    flips false (and the hash mismatches) if the sketch misses an item
    or miscounts it. With 5 distinct types the sketch tracks all items
    exactly; the check is the contract that stays testable when the
    domain outgrows maxItemsTracked."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    exact = (ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"))
             .withColumn("rk", F.row_number().over(
                 W.orderBy(F.desc("n"), "event_type")))
             .filter(F.col("rk") <= _ATK_K))
    sketch = ev.agg(F.expr(f"approx_top_k(event_type, {_ATK_K})")
                    .alias("top"))
    joined = exact.join(F.broadcast(sketch))
    sketch_ok = F.exists(
        "top", lambda s: (s["item"] == F.col("event_type"))
        & (s["count"] == F.col("n")))
    return joined.select(
        "event_type", F.col("n").cast("long").alias("n"),
        F.col("rk").cast("int").alias("rk"),
        sketch_ok.alias("sketch_ok"))


# -- printf / radix / length surface ------------------------------------------


def q_format_funcs(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.format_string("%07d|%s", F.col("c_custkey"),
                        F.col("c_mktsegment")).alias("tag"),
        F.format_string("%.3f", F.col("c_acctbal").cast("double"))
        .alias("bal_str"),
        F.hex(F.col("c_custkey")).alias("key_hex"),
        F.conv(F.col("c_custkey").cast("string"), 10, 2).alias("key_bin"),
        F.expr("repeat('*', CAST(c_custkey % 5 + 1 AS INT))")
        .alias("stars"),
        F.reverse(F.col("c_name")).alias("rev_name"),
        F.length("c_name").alias("n_chars"),
        F.octet_length("c_name").alias("n_bytes"))


_FORMAT_ORACLE = """
    SELECT c_custkey,
           printf('%07d|%s', c_custkey, c_mktsegment) AS tag,
           printf('%.3f', c_acctbal) AS bal_str,
           upper(to_hex(c_custkey)) AS key_hex,
           bin(c_custkey) AS key_bin,
           repeat('*', CAST(c_custkey % 5 + 1 AS INT)) AS stars,
           reverse(c_name) AS rev_name,
           CAST(length(c_name) AS INT) AS n_chars,
           CAST(strlen(c_name) AS INT) AS n_bytes
    FROM customer
"""

# -- hashing-trick featurization ----------------------------------------------

_FH_BUCKETS = 64
_FH_DOCS = 300


def q_feature_hashing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _FH_DOCS)
    return feature_hash_counts(docs, "text", "doc_id",
                               n_buckets=_FH_BUCKETS)


# -- observe / Observation ------------------------------------------------------


def q_observe_metrics(spark, sf_dir):
    """``DataFrame.observe``: accumulator-style metrics collected during
    an existing pass — the production data-quality pattern (row counts,
    null counts, sums ride the write job; NO extra scan). Here the
    observed pass is a noop-sink write; the returned one-row frame holds
    the metrics, and the oracle recomputes them from scratch."""
    from pyspark.sql import Observation

    from datafusion_delta_sharing_spark.functions.money import cents

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents(F.col("l_extendedprice"))).alias("price_cents"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        # DISTINCT aggregates are not allowed in observed metrics
        # ([INVALID_OBSERVED_METRICS]); min/max are
        F.max(cents(F.col("l_extendedprice"))).alias("max_price_cents"))
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["price_cents"], m["n_discounted"],
          m["max_price_cents"])],
        "n_rows bigint, price_cents bigint, n_discounted bigint, "
        "max_price_cents bigint")


# -- calendar constructors ------------------------------------------------------

# DATE results are CAST to TIMESTAMP for the value compare: Spark
# collects DATE as python date objects while DuckDB hands pandas
# datetime64 — wall-equal values that would hash apart (session tz is
# UTC on both sides, so the cast cannot shift instants)
_CAL_SQL = """
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS month_end,
           CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT) AS doy,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
           CAST(make_date(CAST(year(o_orderdate) AS INT),
                          CAST(month(o_orderdate) AS INT), 1)
                AS TIMESTAMP) AS month_start,
           make_timestamp(CAST(year(o_orderdate) AS INT),
                          CAST(month(o_orderdate) AS INT),
                          CAST(day(o_orderdate) AS INT), 12, 0, 0.5)
               AS noonish
    FROM orders
"""


def q_calendar_funcs(spark, sf_dir):
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_CAL_SQL)


# -- BM25 against a query TABLE (VERDICT r6 #5) -------------------------------

# Probe queries as a TABLE (the decontamination-probe shape): mixes the
# rare planted-dup marker (df≈5%) with common terms on both sides of the
# df-cut so the cut is non-vacuous — terms in >78% of documents are
# dropped from postings AND scoring (cut-consistent, lossy-candidate
# contract documented on the operator).
_BMJ_QUERIES = [
    (1, "dup merge window"),
    (2, "hash join sort"),
    (3, "the fast key line"),
    (4, "dup stream order"),
    (5, "vector column value"),
    (6, "scan batch small agg"),
]
_BMJ_FRAC = 0.78
_BMJ_K = 5


def q_bm25_join_topk(spark, sf_dir):
    from pyspark.sql import Window as W

    from datafusion_delta_sharing_spark.operators.retrieval import (
        bm25_join)

    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_BMJ_QUERIES,
                                    "qid int, qtext string")
    scored = bm25_join(docs, queries, "text", "doc_id", "qid", "qtext",
                       max_doc_frac=_BMJ_FRAC)
    ranked = scored.withColumn(
        "rank", F.row_number().over(
            W.partitionBy("qid").orderBy(F.desc("score"), "doc_id")))
    return (ranked.filter(F.col("rank") <= _BMJ_K)
            .select("qid", "doc_id", "n_terms_hit", "score",
                    F.col("rank").cast("int").alias("rank")))


def _bmj_queries_sql() -> str:
    rows = ", ".join(f"({qid}, '{text}')" for qid, text in _BMJ_QUERIES)
    return (f"(SELECT * FROM (VALUES {rows}) AS q(qid, qtext))")


# -- BPE merge loop (VERDICT r6 #4) -------------------------------------------

_BPE_K = 8


def q_bpe_merge_steps(spark, sf_dir):
    from datafusion_delta_sharing_spark.operators.tfidf import (
        bpe_apply_merges)

    docs = load_table(spark, sf_dir, "documents")
    return bpe_apply_merges(docs, "text", k=_BPE_K)


def q_bpe_encode_lens(spark, sf_dir):
    """Token counting under the TRAINED tokenizer (completes the
    train→encode loop): per document, word count and token count after
    the k learned merges. The merges are applied to the vocabulary once;
    the corpus joins the per-word cache — the production encode shape."""
    from datafusion_delta_sharing_spark.operators.tfidf import (
        bpe_encode_lengths)

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_lengths(docs, "text", "doc_id", k=_BPE_K)


# -- UDTF with a TABLE argument ------------------------------------------------

_CHANGE_SQL_ORACLE = """
    SELECT user_id, event_id, event_type
    FROM (
        SELECT user_id, event_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ) WHERE prev IS NULL OR event_type <> prev
"""


def q_udtf_table_arg(spark, sf_dir):
    """Spark 4 UDTF over a TABLE argument with PARTITION BY/ORDER BY —
    the polymorphic table-IN-table-OUT surface (a fresh UDTF instance
    per partition, rows arriving in the declared order): change-point
    detection over each user's event stream. The oracle is the lag-window
    equivalent, so the partition/ordering contract is value-checked, not
    assumed. The multi-column ORDER BY needs the parenthesized form —
    Spark's parser rejects the bare list."""
    from pyspark.sql.functions import udtf

    class ChangePoints:
        def __init__(self):
            self.prev = None

        def eval(self, row):
            if self.prev is None or row.event_type != self.prev:
                yield (row.user_id, row.event_id, row.event_type)
            self.prev = row.event_type

    spark.udtf.register("change_points", udtf(
        ChangePoints,
        returnType="user_id bigint, event_id bigint, event_type string"))
    register_views(spark, sf_dir, ["events"])
    return spark.sql("""
        SELECT * FROM change_points(
            TABLE(SELECT user_id, event_id, event_type, ts FROM events)
            PARTITION BY user_id ORDER BY (ts, event_id))
    """)


# -- AES round-trip ---------------------------------------------------------

_AES_KEY = "0123456789abcdef"  # 16-byte AES-128 key (demo fixture)


def q_aes_roundtrip(spark, sf_dir):
    """GCM ciphertext embeds a random IV, so the VALUE is not oracle-able
    — the invariants are: decrypt∘encrypt is the identity, and the GCM
    frame costs exactly 28 bytes (12 IV + 16 tag) over the plaintext.
    Both are computed in-plan; a broken codec flips a boolean or shifts
    the length and the hash mismatches."""
    cust = load_table(spark, sf_dir, "customer")
    enc = F.expr(f"aes_encrypt(c_name, '{_AES_KEY}')")
    dec = F.expr(f"CAST(aes_decrypt(aes_encrypt(c_name, '{_AES_KEY}'), "
                 f"'{_AES_KEY}') AS STRING)")
    return cust.select(
        "c_custkey", "c_name",
        (dec == F.col("c_name")).alias("roundtrip_ok"),
        (F.octet_length(enc)
         - F.octet_length(F.encode("c_name", "UTF-8")))
        .cast("int").alias("gcm_overhead"))


QUERIES = {
    "bitmap_distinct": q_bitmap_distinct,
    "distinct_aggs": q_distinct_aggs,
    "approx_topk": q_approx_topk,
    "format_funcs": q_format_funcs,
    "feature_hashing": q_feature_hashing,
    "observe_metrics": q_observe_metrics,
    "calendar_funcs": q_calendar_funcs,
    "aes_roundtrip": q_aes_roundtrip,
    "bm25_join_topk": q_bm25_join_topk,
    "bpe_merge_steps": q_bpe_merge_steps,
    "bpe_encode_lens": q_bpe_encode_lens,
    "udtf_table_arg": q_udtf_table_arg,
}

ORACLES = {
    "bitmap_distinct": """
        SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT)
                   AS n_distinct
        FROM events GROUP BY event_type
    """,
    "distinct_aggs": _DISTINCT_AGGS_SQL,
    "approx_topk": f"""
        SELECT event_type, CAST(n AS BIGINT) AS n, CAST(rk AS INT) AS rk,
               TRUE AS sketch_ok
        FROM (
            SELECT event_type, count(*) AS n,
                   row_number() OVER (ORDER BY count(*) DESC, event_type)
                       AS rk
            FROM events GROUP BY event_type
        ) WHERE rk <= {_ATK_K}
    """,
    "format_funcs": _FORMAT_ORACLE,
    "feature_hashing": feature_hash_counts_sql(
        f"(SELECT * FROM documents WHERE doc_id < {_FH_DOCS})",
        "text", "doc_id", n_buckets=_FH_BUCKETS),
    "observe_metrics": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum({_cents_sql('l_extendedprice')}) AS BIGINT)
                   AS price_cents,
               CAST(count_if(l_discount > 0.05) AS BIGINT)
                   AS n_discounted,
               CAST(max({_cents_sql('l_extendedprice')}) AS BIGINT)
                   AS max_price_cents
        FROM lineitem
    """,
    "calendar_funcs": _CAL_SQL,
    "aes_roundtrip": """
        SELECT c_custkey, c_name, TRUE AS roundtrip_ok,
               28 AS gcm_overhead
        FROM customer
    """,
    "bm25_join_topk": None,  # built below (needs the operator's mirror)
    "udtf_table_arg": _CHANGE_SQL_ORACLE,
}


def _bmj_oracle() -> str:
    from datafusion_delta_sharing_spark.operators.retrieval import (
        bm25_join_sql)

    inner = bm25_join_sql("documents", _bmj_queries_sql(), "text",
                          "doc_id", "qid", "qtext",
                          max_doc_frac=_BMJ_FRAC)
    return f"""
        SELECT qid, doc_id, n_terms_hit, score, CAST(rank AS INT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
            FROM ({inner})
        ) WHERE rank <= {_BMJ_K}
    """


ORACLES["bm25_join_topk"] = _bmj_oracle()


def _bpe_oracle() -> str:
    from datafusion_delta_sharing_spark.operators.tfidf import (
        bpe_apply_merges_sql)

    return bpe_apply_merges_sql("documents", "text", k=_BPE_K)


def _bpe_encode_oracle() -> str:
    from datafusion_delta_sharing_spark.operators.tfidf import (
        bpe_encode_lengths_sql)

    return bpe_encode_lengths_sql("documents", "text", "doc_id", k=_BPE_K)


ORACLES["bpe_merge_steps"] = _bpe_oracle()
ORACLES["bpe_encode_lens"] = _bpe_encode_oracle()
