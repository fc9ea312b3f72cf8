"""Extensions batch 15 (r8 session, r9 window slots — WINDOW_PLAN.json
r9_new): lakehouse operations layer — mergeable KMV distinct sketches,
bucket-digest table reconciliation, small-file compaction planning, and
deterministic weighted sampling.

* ``kmv_rollup`` — Beyer et al. k-minimum-values distinct sketch
  (:func:`..operators.sketches.kmv_partials`): per-group partials merge
  into the '__all__' union estimate WITHOUT rescanning raw rows — the
  third member of the mergeable-rollup family (hll_rollup approx ✅,
  bitmap_distinct exact ✅, KMV adds set-algebra-capable approx), with an
  in-plan relative-error attestation against the exact distinct.
* ``table_diff`` — anti-entropy reconciliation
  (:func:`..operators.reconcile.table_diff_digest`): two snapshots
  reduce to 256 (bucket, count, xor-digest) rows each; the join names
  exactly the buckets containing any insert/update/delete. 2 scans +
  512 summary rows at any scale — never a row shuffle.
* ``compaction_plan`` — greedy single-window bin packing of a file
  inventory into ~target_bytes compaction groups
  (:func:`..operators.layout.compaction_bins`) — the planner half of
  the lakehouse small-file problem.
* ``weighted_sample`` — deterministic weighted sampling without
  replacement (:func:`..operators.sampling.weighted_sample`), the
  division-keyed Efraimidis–Spirakis variant whose sample set is
  bit-reproducible across engines/partitionings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions.money import (
    cents, cents_sql)
from datafusion_delta_sharing_spark.harness import (
    load_table, register_views)
from datafusion_delta_sharing_spark.operators import layout as LY
from datafusion_delta_sharing_spark.operators import reconcile as RC
from datafusion_delta_sharing_spark.operators import sampling as SA
from datafusion_delta_sharing_spark.operators import sketches as SK

# -- KMV distinct rollup --------------------------------------------------------

_KMV_K = 256
# 4-sigma for the Beyer estimator (sigma ~ 1/sqrt(k-2)): measured
# relative error at sf0.01 is 2-12%; the bound is the attestation knob,
# non-vacuous via the corrupt test in tests/test_extensions15.py
_KMV_REL_BOUND = 0.25


def q_kmv_rollup(spark, sf_dir):
    """Distinct USER-DAYS per event type AND overall, twice: exactly
    (raw count-distinct, the attestation side) and from the KMV sketch
    (the rollup side — '__all__' comes from MERGING the per-type
    partials, never rescanning events). User-days, not users: the
    user-day cardinality (~30x users) exceeds k at EVERY test SF, so
    the driver row exercises the estimator branch, not just the
    exact-below-k path. ``est_ok`` bounds the relative error; both
    engines compute the identical division, so the flag and the raw
    estimate hash-match. Measured relative error 2-12% across the
    groups at sf0.01 (worst 1.9 sigma) vs the 25% 4-sigma bound."""
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type",
                  F.concat(F.col("user_id").cast("string"), F.lit(":"),
                           F.col("ts").cast("date").cast("string"))
                  .alias("user_day")))
    partials = SK.kmv_partials(ev, "event_type", "user_day", _KMV_K)
    partials = partials.localCheckpoint(eager=True)  # merge reuses them
    ests = SK.kmv_estimate(
        partials.unionByName(SK.kmv_merge(partials, _KMV_K)), _KMV_K)
    exact = (ev.groupBy(F.col("event_type").alias("g"))
             .agg(F.countDistinct("user_day").alias("n_exact"))
             .unionByName(
                 ev.agg(F.countDistinct("user_day").alias("n_exact"))
                 .withColumn("g", F.lit("__all__"))))
    ok = (F.abs(F.col("n_est") / F.col("n_exact") - 1.0)
          <= F.lit(_KMV_REL_BOUND))
    return (exact.join(ests, "g")
            .select(F.col("g").alias("event_type"), "n_exact", "n_est",
                    ok.alias("est_ok")))


_KMV_SRC = ("(SELECT event_type, user_id || ':' || "
            "CAST(CAST(ts AS DATE) AS VARCHAR) AS user_day FROM events)")

_KMV_ORACLE = f"""
    WITH ests AS ({SK.kmv_sql(_KMV_SRC, 'event_type', 'user_day',
                              _KMV_K)}),
    exact AS (
        SELECT event_type AS g,
               CAST(count(DISTINCT user_day) AS BIGINT) AS n_exact
        FROM {_KMV_SRC} GROUP BY event_type
        UNION ALL
        SELECT '__all__' AS g,
               CAST(count(DISTINCT user_day) AS BIGINT) AS n_exact
        FROM {_KMV_SRC}
    )
    SELECT g AS event_type, n_exact, n_est,
           abs(n_est / n_exact - 1.0) <= {_KMV_REL_BOUND!r} AS est_ok
    FROM exact JOIN ests USING (g)
"""

# -- table reconciliation ---------------------------------------------------------

# snapshot B perturbs A deterministically: deletes (% 1009), +1-cent
# updates (% 613), and inserts (key-shifted clones of % 1501 rows) — so
# the differing-bucket set is a real mixed diff, not one class of change
_TD_A_SQL = (f"(SELECT o_orderkey AS k, o_custkey AS c, "
             f"o_orderstatus AS s, {cents_sql('o_totalprice')} AS tc, "
             f"o_orderdate AS d FROM orders)")
_TD_B_SQL = f"""(
    SELECT k, c, s,
           CASE WHEN k % 613 = 0 THEN tc + 1 ELSE tc END AS tc, d
    FROM {_TD_A_SQL} WHERE k % 1009 != 0
    UNION ALL
    SELECT k + 10000000 AS k, c, s, tc, d
    FROM {_TD_A_SQL} WHERE k % 1501 = 0
)"""

_TD_REPR = "concat_ws('|', k, c, s, tc, d)"


def q_table_diff(spark, sf_dir):
    """Bucket-digest diff of the orders snapshot against its perturbed
    successor: output is exactly the buckets whose 60-bit xor digest or
    count changed. The snapshots and the canonical row rendering are
    shared SQL fragments, so the Spark and DuckDB sides hash identical
    bytes. Row values render as integers/dates/strings only (cents for
    the money column) — double-to-string is not cross-engine-stable."""
    register_views(spark, sf_dir, ["orders"])
    a = spark.sql(f"SELECT * FROM {_TD_A_SQL} x")
    b = spark.sql(f"SELECT * FROM {_TD_B_SQL} x")
    return RC.table_diff_digest(a, b, "k", F.expr(_TD_REPR))


# -- compaction planning -----------------------------------------------------------

# file inventory proxy: one "file" per (ship-month, orderkey%40) cell,
# sized by its total extendedprice cents — a deterministic stand-in for
# (partition, file, bytes) metadata
_CP_FILES_SQL = """
    SELECT part, fid, CAST(sum(sz) AS BIGINT) AS bytes
    FROM (
        SELECT date_trunc('month', l_shipdate) AS part,
               l_orderkey % 40 AS fid,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS sz
        FROM lineitem
    ) GROUP BY part, fid
"""
_CP_TARGET = 300_000_000


def q_compaction_plan(spark, sf_dir):
    """Greedy bin-packing of the synthetic file inventory into
    ~3e8-byte compaction groups, per ship-month partition: the
    single-window streaming formulation (bin = floor(bytes_before /
    target)), one shuffle on the partition key."""
    register_views(spark, sf_dir, ["lineitem"])
    files = spark.sql(_CP_FILES_SQL)
    return LY.compaction_bins(files, "part", "fid", "bytes", _CP_TARGET)


# -- weighted sampling ---------------------------------------------------------------

_WS_N = 25


def q_weighted_sample(spark, sf_dir):
    """25 documents per language, selected without replacement with
    probability increasing in n_chars — the deterministic division-keyed
    Efraimidis–Spirakis race (see operators/sampling.weighted_sample for
    why division, not ln). Output carries no floats."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.weighted_sample(docs, "lang", "doc_id", "n_chars", _WS_N)


QUERIES = {
    "kmv_rollup": q_kmv_rollup,
    "table_diff": q_table_diff,
    "compaction_plan": q_compaction_plan,
    "weighted_sample": q_weighted_sample,
}

ORACLES = {
    "kmv_rollup": _KMV_ORACLE,
    "table_diff": RC.table_diff_digest_sql(
        _TD_A_SQL, _TD_B_SQL, "k", _TD_REPR),
    "compaction_plan": LY.compaction_bins_sql(
        _CP_FILES_SQL, "part", "fid", "bytes", _CP_TARGET),
    "weighted_sample": SA.weighted_sample_sql(
        "SELECT lang, doc_id, n_chars FROM documents", "lang",
        "doc_id", "n_chars", _WS_N),
}
