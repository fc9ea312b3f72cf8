"""Tier-B batch 6: higher-order array functions, fault-tolerant (try_*)
arithmetic, data masking, URL parsing. All JVM-side Column expressions —
the higher-order functions in particular are the scale story for
array-typed columns: per-row lambdas run inside codegen, no explode, no
Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import cents_sql
from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators.skew import salted_join


def q_array_hof(spark, sf_dir):
    """filter / exists / forall / zip_with / sort+slice over embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(F.filter(v, lambda x: dbl(x) > 0)).cast("bigint")
        .alias("n_pos"),
        F.exists(v, lambda x: dbl(x) > 1.0).alias("any_gt1"),
        F.forall(v, lambda x: F.abs(dbl(x)) < 100.0).alias("all_bounded"),
        F.round(F.aggregate(
            F.zip_with(v, F.reverse(v), lambda a, b: dbl(a) * dbl(b)),
            F.lit(0.0), lambda acc, x: acc + x), 5).alias("dot_reversed"),
        F.round(F.aggregate(
            F.slice(F.sort_array(v, asc=False), 1, 3),
            F.lit(0.0), lambda acc, x: acc + dbl(x)), 5).alias("top3_sum"),
    )


def q_try_arith(spark, sf_dir):
    """try_divide / NULLIF semantics and try_cast: errors become NULLs
    instead of task failures — what you want 80 TB into a 100 TB job."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.round(F.try_divide("o_totalprice",
                             (F.col("o_orderkey") % 3).cast("double")), 4)
        .alias("price_over_mod"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int")
        .cast("bigint").alias("priority_digit"),
    )


def q_mask_funcs(spark, sf_dir):
    """Deterministic data masking (upper->X, lower->x, digit->n)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.mask("c_name").alias("name_masked"),
        F.mask("c_mktsegment", F.lit("U"), F.lit("l"), F.lit("9"))
        .alias("segment_masked"),
    )


def q_url_funcs(spark, sf_dir):
    """parse_url over a synthesized URL column (host/path/query extraction
    + percent-encoding round-trip)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
                   F.lit("?lang="), F.col("lang"))
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.url_encode(F.concat(F.col("source"), F.lit("/"), F.col("lang")))
        .alias("encoded"),
    )


def q_join_salted(spark, sf_dir):
    """Salted join on a pathologically skewed key (5 event types over 60k
    rows): the skewed side fans each hot key over 16 reducers, the tiny
    side replicates 16x. Aggregated output proves result-equivalence with
    the plain join the oracle runs.

    Determinism (VERDICT r5 #1): the salt is a pure function of event_id
    (not monotonically_increasing_id), and the output columns avoid the
    residual-of-zero trap — `sum(value - type_avg)` is mathematically 0 so
    its rounded value is an accumulation-order-dependent +/-0.0; we emit
    `sum_value` (a well-conditioned positive sum) plus the boolean
    `dev_near_zero` instead.

    The near-zero gate SCALES WITH THE GROUP (VERDICT r6 #2): the float
    residual grows with row count while a static 1e-6 does not — measured
    2e-10 at sf0.01 → 7e-9 at sf0.1, a knife edge by sf10–100. The bound
    `1e-12 · n · avg(|value|)` is the standard backward-error model
    (per-element rounding ~1e-16 × a ~1e4 condition allowance), grows
    with the group exactly as the residual does, and keeps ≥100× margin
    at every probed SF (sf1-verified)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    dim = events.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    joined = salted_join(events, dim, on="event_type", salts=16,
                         salt_on=["event_id"])
    tol = (F.lit(1e-12) * F.count(F.lit(1))
           * F.avg(F.abs(F.col("value"))))
    return (joined
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"),
                 (F.abs(F.sum(F.col("value") - F.col("type_avg")))
                  < tol).alias("dev_near_zero")))


def q_time_spine(spark, sf_dir):
    """Gap-filled hourly time spine: generate every hour in the events
    range with F.sequence + explode (no driver loop), left join hourly
    purchase aggregates, zero-fill gaps. The spine generation is a
    single-row seed exploded JVM-side."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR")))
        .alias("hour"))
    # integer cents before summation (r9 review): round(sum(double), 4)
    # was the accumulation-order-sensitive output class the repo retired
    # everywhere else (functions/money)
    from datafusion_delta_sharing_spark.functions import money as MONEY

    hourly = (events.filter(F.col("event_type") == "purchase")
              .groupBy(F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count("*").alias("n_purchases"),
                   F.sum(MONEY.cents(F.col("value"))).cast("bigint")
                   .alias("revenue_cents")))
    return (spine.join(hourly, "hour", "left")
            .select(F.col("hour").cast("timestamp_ntz").alias("hour"),
                    F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
                    F.coalesce("revenue_cents", F.lit(0))
                    .cast("bigint").alias("revenue_cents")))


QUERIES = {
    "array_hof": q_array_hof,
    "join_salted": q_join_salted,
    "time_spine": q_time_spine,
    "try_arith": q_try_arith,
    "mask_funcs": q_mask_funcs,
    "url_funcs": q_url_funcs,
}

ORACLES = {
    "join_salted": """
        SELECT e.event_type, count(*) AS n,
               round(sum(e.value), 4) AS sum_value,
               abs(sum(e.value - d.type_avg))
                   < 1e-12 * count(*) * avg(abs(e.value)) AS dev_near_zero
        FROM events e
        JOIN (SELECT event_type, avg(value) AS type_avg
              FROM events GROUP BY event_type) d
          ON e.event_type = d.event_type
        GROUP BY e.event_type
    """,
    "time_spine": f"""
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        hourly AS (
            SELECT date_trunc('hour', ts) AS hour, count(*) AS n_purchases,
                   CAST(sum({cents_sql('value')}) AS BIGINT)
                       AS revenue_cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT s.hour, coalesce(h.n_purchases, 0) AS n_purchases,
               CAST(coalesce(h.revenue_cents, 0) AS BIGINT)
                   AS revenue_cents
        FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
    """,
    "array_hof": """
        SELECT vec_id,
               CAST(len(list_filter(embedding,
                    x -> CAST(x AS DOUBLE) > 0)) AS BIGINT) AS n_pos,
               len(list_filter(embedding,
                   x -> CAST(x AS DOUBLE) > 1.0)) > 0 AS any_gt1,
               len(list_filter(embedding,
                   x -> abs(CAST(x AS DOUBLE)) >= 100.0)) = 0 AS all_bounded,
               round(list_sum(list_transform(
                   list_zip(embedding, list_reverse(embedding)),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 5)
                   AS dot_reversed,
               round(list_sum(list_transform(
                   list_reverse(list_sort(embedding))[1:3],
                   x -> CAST(x AS DOUBLE))), 5) AS top3_sum
        FROM embeddings
    """,
    "try_arith": """
        SELECT o_orderkey,
               round(o_totalprice
                     / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0), 4)
                   AS price_over_mod,
               TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
               CAST(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
                    AS BIGINT) AS priority_digit
        FROM orders
    """,
    "mask_funcs": """
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(c_name,
                   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                   AS name_masked,
               regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
                   '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '9', 'g')
                   AS segment_masked
        FROM customer
    """,
    "url_funcs": """
        SELECT doc_id,
               source || '.example.com' AS host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS path,
               lang AS lang_param,
               -- this DuckDB build has no url_encode; inputs are
               -- alphanumeric + '/', so percent-encoding is just %2F.
               -- The CASE guard ENFORCES that invariant: testdata that
               -- ever adds a space/'+'/':'/non-ASCII fails the oracle
               -- loudly here instead of hash-mismatching mysteriously
               CASE WHEN regexp_matches(source || lang, '[^A-Za-z0-9._/-]')
                    THEN error('url_funcs oracle: source/lang contains a '
                               'character its replace()-based encoder '
                               'cannot handle — use a real encoder')
                    ELSE replace(source || '/' || lang, '/', '%2F')
               END AS encoded
        FROM documents
    """,
}
