"""Extensions batch 10: retrieval scoring, importance-based data
selection, and streaming session windows.

* ``bm25_topk`` — Okapi BM25 over the documents table for a fixed query
  mixing one rare term ('dup' — the planted-duplicate marker, df≈5%)
  with common ones, top-50 by (score, doc_id). One corpus shuffle
  (:mod:`..operators.retrieval`).
* ``dsir_select`` — DSIR importance selection: hashed-bigram LM of the
  target slice (source = 'src18') vs the raw pool, top-100 pool docs by
  mean log-likelihood ratio. Bucket table bounded by the hash space, so
  the scoring join broadcasts at any corpus size.
* ``stream_session`` — session_window aggregation under Structured
  Streaming (incremental session-merge state), same oracle as the batch
  ``session_window_batch`` query — the two MUST agree with each other
  and with the islands SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.harness.tierb5 import (
    ORACLES as _T5_ORACLES)
from datafusion_delta_sharing_spark.operators.retrieval import (
    bm25_scores, bm25_scores_sql, dsir_logratio, dsir_logratio_sql,
    sparse_cosine_pairs, sparse_cosine_pairs_sql)
from datafusion_delta_sharing_spark.operators.tfidf import (
    bpe_pair_counts, bpe_pair_counts_sql)
from datafusion_delta_sharing_spark.streaming.windows import (
    stream_session_counts)

_BM25_TERMS = ("dup", "merge", "window", "hash")
_BM25_K = 50
_DSIR_TARGET_SQL = "source = 'src18'"
_DSIR_N = 100


def q_bm25_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs, "text", "doc_id", _BM25_TERMS)
    return scored.orderBy(F.desc("score"), "doc_id").limit(_BM25_K)


def q_dsir_select(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_logratio(docs, "text", "doc_id",
                           F.col("source") == "src18")
    return scored.orderBy(F.desc("logratio"), "doc_id").limit(_DSIR_N)


def q_stream_session(spark, sf_dir):
    return stream_session_counts(spark, sf_dir)


# relative df-cut: terms in >78% of documents are cut from the posting
# lists (keeps ~18 of the corpus' 31 tokens at any SF — non-vacuous cut,
# non-degenerate pairs; a FRACTION so the knob keeps meaning as the
# corpus grows)
_SPARSE_DF_FRAC = 0.78
# pinned workload (the ngram_jaccard pattern): the synthetic corpus has a
# 31-token vocabulary, so EVERY kept token is near-universal and the
# posting self-join fan-out Σ df² is quadratic in corpus size — a df-cut
# only bounds fan-out under Zipfian vocabularies (real corpora), where
# kept terms have small df. The registry query therefore pins the doc
# subset for oracle checkability; the true scale path for all-pairs
# similarity on degenerate vocabularies is minhash-LSH (dedup_minhash).
_SPARSE_DOCS = 300
_SPARSE_K = 100
_BPE_K = 50


def q_bpe_pair_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, "text", top_k=_BPE_K)


def q_sparse_cosine_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _SPARSE_DOCS)
    return sparse_cosine_pairs(docs, "text", "doc_id",
                               max_doc_frac=_SPARSE_DF_FRAC,
                               top_k=_SPARSE_K)


_HLL_TOL = 0.05   # lgConfigK=12 -> ~1.6% standard error; 5% is 3 sigma


def q_hll_rollup(spark, sf_dir):
    """Re-aggregatable distinct-count sketches — the pre-aggregated
    rollup primitive of a 100 TB warehouse: per-event-type HLL sketches
    of event_id (Spark 3.5 Datasketches `hll_sketch_agg`), then the
    TOTAL distinct count from `hll_union_agg` over the per-type sketches
    alone — the corpus is never rescanned for the rollup, which is the
    whole point (daily sketches merge into monthly counts for free).

    The sketch estimate is engine-specific, so the emitted columns are
    the EXACT count plus a within-tolerance boolean computed in-plan
    against the estimate (the approx_count_distinct bounded-error oracle
    pattern): if the sketch machinery breaks, within_tol flips to false
    and the hash mismatches."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(event_id)").alias("sk"),
        F.countDistinct("event_id").alias("n_exact"))
    tol_ok = (F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("n_exact"))
              <= _HLL_TOL * F.col("n_exact"))
    per = per_type.select(
        "event_type", F.col("n_exact").cast("bigint").alias("n_exact"),
        tol_ok.alias("within_tol"))
    merged = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_all"))
    exact_all = ev.agg(
        F.countDistinct("event_id").alias("n_exact"))
    total = (merged.join(F.broadcast(exact_all))
             .select(F.lit("__all__").alias("event_type"),
                     F.col("n_exact").cast("bigint").alias("n_exact"),
                     (F.abs(F.col("est_all") - F.col("n_exact"))
                      <= _HLL_TOL * F.col("n_exact")).alias("within_tol")))
    return per.unionByName(total)


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "dsir_select": q_dsir_select,
    "stream_session": q_stream_session,
    "bpe_pair_counts": q_bpe_pair_counts,
    "sparse_cosine_topk": q_sparse_cosine_topk,
    "hll_rollup": q_hll_rollup,
}

ORACLES = {
    "bm25_topk": f"""
        SELECT * FROM ({bm25_scores_sql('documents', 'text', 'doc_id',
                                        _BM25_TERMS)})
        ORDER BY score DESC, doc_id LIMIT {_BM25_K}
    """,
    "dsir_select": f"""
        SELECT * FROM ({dsir_logratio_sql('documents', 'text', 'doc_id',
                                          _DSIR_TARGET_SQL)})
        ORDER BY logratio DESC, doc_id LIMIT {_DSIR_N}
    """,
    # the streaming session aggregation must equal the batch operator's
    # islands oracle exactly — reuse that SQL so the two cannot drift
    "stream_session": _T5_ORACLES["session_window_batch"],
    "bpe_pair_counts": bpe_pair_counts_sql("documents", "text",
                                           top_k=_BPE_K),
    "sparse_cosine_topk": sparse_cosine_pairs_sql(
        f"(SELECT * FROM documents WHERE doc_id < {_SPARSE_DOCS})",
        "text", "doc_id", max_doc_frac=_SPARSE_DF_FRAC, top_k=_SPARSE_K),
    "hll_rollup": """
        SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT)
                   AS n_exact,
               TRUE AS within_tol
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '__all__' AS event_type,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact,
               TRUE AS within_tol
        FROM events
    """,
}
