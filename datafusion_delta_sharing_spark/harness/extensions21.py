"""Extensions batch 21 (r9 session, r10 window slots — WINDOW_PLAN.json
r10_new): sketch set-algebra and streaming dimension maintenance, the
two family completions VERDICT r8 prescribed (#4, #5).

* ``kmv_overlap`` — sketch-level intersection / Jaccard estimation
  (:func:`..operators.sketches.kmv_overlap`, Beyer et al. 2007 §5): two
  corpora's overlap estimated from their 2×k KMV hash sketches alone —
  the sketch sibling of ``corpus_overlap``'s exact distinct-shingle
  equi-join, with an in-row bounded-error attestation against that
  exact answer.
* ``stream_scd2_upsert`` — incremental SCD2 dimension maintenance
  (:func:`..streaming.scd2.stream_scd2_upsert`): a foreachBatch MERGE
  that closes each entity's open interval and inserts the new version
  per micro-batch of CDC events; the final interval table must equal
  the batch ``scd2_build`` over the same events bit-for-bit, regardless
  of how the stream was micro-batched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import corpusstats as CS
from datafusion_delta_sharing_spark.operators import dedup as DD
from datafusion_delta_sharing_spark.operators import sketches as SK

# -- KMV sketch-level overlap -----------------------------------------------------

_KO_K = 256
# SCALE-STABLE corpora split (unlike corpus_overlap's fixed 50-doc
# overlap band, which drives the shingle Jaccard toward 0 as the corpus
# grows and starves the sketch of intersection hashes): A = 60 % of
# docs, B = 60 %, sharing the doc_id % 10 ∈ {4, 5} fifth — the
# shingle-level Jaccard stays ~0.2 at every SF, so J·k ≈ 50
# intersection hashes land in the combined sketch at any scale
_KO_A_PRED, _KO_B_PRED = "doc_id % 10 < 6", "doc_id % 10 >= 4"
# attestation knobs (4-sigma-ish for the Beyer §5 estimators at k=256:
# sigma_jaccard ~ sqrt(J(1-J)/k) ≈ 0.025, sigma_rel(union) ~
# 1/sqrt(k-2) ≈ 0.063, sigma_rel(inter) ~ sqrt((1-J)/(J·k)) ≈ 0.12);
# measured at sf0.01/sf0.1 the worst errors are well inside — the
# corrupt-by-one test in tests/test_extensions21.py keeps the bounds
# non-vacuous
_KO_JAC_ABS_BOUND = 0.10
_KO_UNION_REL_BOUND = 0.25
_KO_INTER_REL_BOUND = 0.50


def q_kmv_overlap(spark, sf_dir):
    """Overlap of two 60 %-of-documents corpora sharing a fifth of the
    docs (the scale-stable modulus split) at the distinct 5-shingle
    level, twice: exactly (corpus_overlap's distinct-shingle equi-join,
    the attestation side) and from the two corpora's KMV sketches alone
    (2×256 hashes — the path that never joins raw rows). In-row flags
    bound the Jaccard absolute error and the union / intersection
    relative errors; every double is a fixed-shape expression over
    exact integers, so both engines hash-match."""
    # ONE groupBy(sh) membership pass serves everything (r11, VERDICT
    # r10 #7; the r10 form still shuffled label-DOUBLED (g, sh) explode
    # rows through a distinct before either consumer): the raw (id, sh)
    # explode goes straight into a map-side-partial groupBy(sh) whose
    # max(when(...)) flags carry both corpus memberships — the overlap
    # fifth never duplicates its shingle rows into the exchange, the
    # (g, sh) distinct exchange disappears outright, and the
    # vocabulary-sized FLAG frame (one row per distinct shingle) is the
    # shared checkpoint both answers read: the exact n_inter / n_union
    # aggregate directly, the KMV sketches by re-deriving (g, sh) label
    # rows from the flags (kmv_partials dedups (g, hash) itself, so the
    # sketch content — and the oracle, which is UNCHANGED — stays
    # bit-identical). Lazy checkpoint as before (r10 measured it ~25%
    # faster than re-deriving for this two-consumer crossJoin topology).
    docs = load_table(spark, sf_dir, "documents")
    # _with_shingles renames the id column to `id`; the corpus
    # predicates are pure doc_id arithmetic, so evaluate them on it
    a_pred = F.expr(_KO_A_PRED.replace("doc_id", "id"))
    b_pred = F.expr(_KO_B_PRED.replace("doc_id", "id"))
    flags = (DD._with_shingles(docs, "text", "doc_id", 5)
             .select("id", F.explode("shingles").alias("sh"))
             .groupBy("sh")
             .agg(F.max(F.when(a_pred, 1).otherwise(0)).alias("in_a"),
                  F.max(F.when(b_pred, 1).otherwise(0)).alias("in_b"))
             # docs outside both corpora would contribute phantom rows;
             # the modulus split covers every doc, so this is parity
             # armor, not a live filter
             .filter((F.col("in_a") == 1) | (F.col("in_b") == 1))
             ).localCheckpoint(eager=False)
    labeled = flags.select(
        F.explode(F.array_compact(F.array(
            F.when(F.col("in_a") == 1, F.lit("a")),
            F.when(F.col("in_b") == 1, F.lit("b"))))).alias("g"),
        "sh")
    partials = SK.kmv_partials(labeled, "g", "sh", _KO_K)
    est = SK.kmv_overlap(partials, _KO_K, "a", "b")
    exact = flags.agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_inter"),
        F.count(F.lit(1)).alias("n_union"))
    jac_exact = (F.col("n_inter").cast("double")
                 / F.col("n_union").cast("double"))
    return (exact.crossJoin(est)  # 1-row x 1-row
            .withColumn("jaccard_exact", jac_exact)
            .select(
                "n_inter", "n_union", "k_eff", "k_inter",
                "union_est", "jaccard_est", "inter_est", "jaccard_exact",
                (F.abs(F.col("jaccard_est") - F.col("jaccard_exact"))
                 <= F.lit(_KO_JAC_ABS_BOUND)).alias("jaccard_ok"),
                (F.abs(F.col("union_est") / F.col("n_union") - 1.0)
                 <= F.lit(_KO_UNION_REL_BOUND)).alias("union_ok"),
                (F.abs(F.col("inter_est") / F.col("n_inter") - 1.0)
                 <= F.lit(_KO_INTER_REL_BOUND)).alias("inter_ok")))


def _ko_shingles_sql() -> str:
    from datafusion_delta_sharing_spark.harness.extensions3 import (
        _shingles_sql)

    a = _shingles_sql(f"documents WHERE {_KO_A_PRED}")
    b = _shingles_sql(f"documents WHERE {_KO_B_PRED}")
    return (f"SELECT 'a' AS g, sh FROM ({a}) "
            f"UNION ALL SELECT 'b' AS g, sh FROM ({b})")


def _kmv_overlap_oracle() -> str:
    from datafusion_delta_sharing_spark.harness.extensions3 import (
        _shingles_sql)

    # partials via the same k-minimum derivation kmv_sql uses
    partials = f"""
        SELECT g, h FROM (
            SELECT g, h,
                   row_number() OVER (PARTITION BY g ORDER BY h) AS r
            FROM (
                SELECT DISTINCT g,
                       {SK._kmv_hash_sql('sh', 'kmv1')} AS h
                FROM ({_ko_shingles_sql()})
            )
        ) WHERE r <= {_KO_K}
    """
    est = SK.kmv_overlap_sql(partials, _KO_K, "a", "b")
    exact = CS.corpus_overlap_sql(
        _shingles_sql(f"documents WHERE {_KO_A_PRED}"),
        _shingles_sql(f"documents WHERE {_KO_B_PRED}"))
    return f"""
        WITH est AS ({est}), exact AS ({exact})
        SELECT n_inter, n_union, k_eff, k_inter,
               union_est, jaccard_est, inter_est,
               CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE)
                   AS jaccard_exact,
               abs(jaccard_est - CAST(n_inter AS DOUBLE)
                                 / CAST(n_union AS DOUBLE))
                   <= {_KO_JAC_ABS_BOUND!r} AS jaccard_ok,
               abs(union_est / n_union - 1.0)
                   <= {_KO_UNION_REL_BOUND!r} AS union_ok,
               abs(inter_est / n_inter - 1.0)
                   <= {_KO_INTER_REL_BOUND!r} AS inter_ok
        FROM exact CROSS JOIN est
    """


# -- streaming SCD2 maintenance ---------------------------------------------------


def q_stream_scd2_upsert(spark, sf_dir):
    """Incremental SCD2 maintenance (VERDICT r8 #5): the change log
    replays as 3 time-ordered micro-batches; each foreachBatch MERGE
    closes the touched entities' open intervals and inserts the new
    versions into bucket-partitioned parquet state (the streaming-
    upsert stamp recipe makes replays exactly-once per (bucket,
    batch)). The returned final dimension must equal the batch
    ``scd2_build`` bit-for-bit — the oracle IS the batch interval SQL,
    so the driver's hash compare is the CDC→dimension parity check."""
    from datafusion_delta_sharing_spark.streaming.scd2 import (
        stream_scd2_upsert)

    return stream_scd2_upsert(spark, sf_dir)


QUERIES = {
    "kmv_overlap": q_kmv_overlap,
    "stream_scd2_upsert": q_stream_scd2_upsert,
}


def _scd2_oracle() -> str:
    # the batch build's SQL verbatim — final streamed state == batch build
    from datafusion_delta_sharing_spark.harness.extensions7 import (
        _SCD2_SQL)

    return _SCD2_SQL


ORACLES = {
    "kmv_overlap": _kmv_overlap_oracle(),
    "stream_scd2_upsert": _scd2_oracle(),
}
