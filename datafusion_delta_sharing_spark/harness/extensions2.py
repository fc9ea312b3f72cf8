"""Extension queries, batch 2: training-data preparation operators —
document chunking, sequence packing, deterministic splits, PII redaction,
TF-IDF / vocabulary, and embedding transforms. All oracle-checked; the
SQL mirrors are generated from the same specs as the Spark plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions import text as TX
from datafusion_delta_sharing_spark.functions.splits import (
    split_assign, split_assign_sql)
from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import chunking as CH
from datafusion_delta_sharing_spark.operators import decontam as DC
from datafusion_delta_sharing_spark.operators import embeddings as EM
from datafusion_delta_sharing_spark.operators import pipeline as PL
from datafusion_delta_sharing_spark.operators import sampling as SA
from datafusion_delta_sharing_spark.operators import spans as SP
from datafusion_delta_sharing_spark.operators import tfidf as TI

_CHUNK_DOCS = 300        # doc_id bound for the chunking query
_TFIDF_DOCS = 300        # doc_id bound for per-doc top terms
_CHUNK_SIZE, _OVERLAP = 64, 16
_PACK_BUDGET, _PACK_BUCKETS = 2048, 8
_VOCAB_MIN_DF, _VOCAB_SIZE = 2, 100

# Planted PII (the synthetic corpus contains none): a per-doc suffix with an
# email, a phone, and an SSN, mirrored verbatim in the oracle so the
# redaction regexes are exercised on every row. Column objects need a live
# session, hence the thunk.
def _pii_suffix_spark():
    return F.concat(
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or (415) 555-0132 ssn 123-45-6789."))


_PII_SUFFIX_SQL = (" contact user' || CAST(doc_id AS VARCHAR) || "
                   "'@example.com or (415) 555-0132 ssn 123-45-6789.")


def q_doc_chunks(spark, sf_dir):
    """Sliding-window token chunks (shard prep for pre-training)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CHUNK_DOCS)
    return CH.chunk_documents(docs, "text", "doc_id",
                              chunk_size=_CHUNK_SIZE, overlap=_OVERLAP)


def q_seq_pack(spark, sf_dir):
    """Concat-and-chunk packing of documents into fixed token budgets."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count("text").alias("n_tok"))
    return CH.pack_sequences(docs, "doc_id", "n_tok",
                             budget=_PACK_BUDGET, n_buckets=_PACK_BUCKETS)


def q_train_split(spark, sf_dir):
    """Deterministic hash-based train/val/test assignment."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", split_assign("doc_id").alias("split"))


def q_pii_redact(spark, sf_dir):
    """PII redaction over text with planted email/phone/SSN per row."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), _pii_suffix_spark())
    return docs.select("doc_id", TX.redact_pii(dirty).alias("clean_text"))


def q_tfidf_top(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _TFIDF_DOCS)
    return TI.tfidf_top_terms(docs, "text", "doc_id", top_k=3)


def q_vocab_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return TI.build_vocab(docs, "text", "doc_id",
                          min_df=_VOCAB_MIN_DF, size=_VOCAB_SIZE)


def q_embed_normalize(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return EM.l2_normalize_digest(emb, "embedding", "vec_id")


def q_embed_quantize(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return EM.quantize_int8(emb, "embedding", "vec_id")


def q_pipeline_e2e(spark, sf_dir):
    """Flagship composition: quality filter -> exact dedup -> train split ->
    chunk -> pack, one lazy plan. Exact duplicates are planted (every doc
    gets a verbatim copy at doc_id + 1_000_000) so the dedup stage provably
    removes 50% of the corpus; survivors are the original ids."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text")
    return PL.prepare_training_corpus(docs.unionByName(copies),
                                      "text", "doc_id")


def q_stratified_sample(spark, sf_dir):
    """Deterministic 20-per-language sample of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return (SA.stratified_sample(docs, "lang", "doc_id", n_per_stratum=20)
            .select("doc_id", "lang"))


_HEAD_SOURCES = ("src0", "src1", "src2", "src3", "src4")


def q_weighted_mixture(spark, sf_dir):
    """Training mixture: keep 70% of the head sources, 30% of the tail,
    tagged with the mixture component."""
    docs = load_table(spark, sf_dir, "documents")
    head = docs.filter(F.col("source").isin(*_HEAD_SOURCES))
    tail = docs.filter(~F.col("source").isin(*_HEAD_SOURCES))
    return (SA.weighted_mixture({"head": (head, 0.7), "tail": (tail, 0.3)},
                                "doc_id")
            .select("doc_id", "source", "mix_source"))


_QUALITY_Q = 0.25        # drop the bottom quality quartile


def q_quality_filter(spark, sf_dir):
    """Percentile-threshold corpus pruning: flag documents at or above the
    corpus p25 quality score (discrete quantile, integer-exact threshold —
    no interpolation, so the boundary can't flip between engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.quantile_threshold_flags(
        docs, TX.quality_score("text"), "doc_id",
        q=_QUALITY_Q, score_name="quality")


_BENCH_DOCS = 40         # doc_id bound for the planted "benchmark" set
_DECON_K = 8             # contamination shingle width


def q_decontaminate(spark, sf_dir):
    """Benchmark-contamination flags: the 'benchmark' is the verbatim text
    of the first _BENCH_DOCS documents, so those docs (plus any document
    sharing an 8-gram of boilerplate with them) are provably flagged —
    both contamination classes flow through the check."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < _BENCH_DOCS).select("text")
    return DC.contamination_flags(docs, bench, "text", "doc_id", k=_DECON_K)


def q_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition signals: duplicate-word and duplicate-3-gram
    fractions, plus the 3-gram ratio on the doc concatenated with itself
    (provably > 0 — the ratio math is exercised on every row, not just the
    few naturally repetitive docs).

    The word and shingle arrays are materialized in staged selects
    (CollapseProject keeps multiply-referenced non-cheap aliases): the
    convenience one-liner form re-splits the text per shingle and
    re-shingles per ratio reference — measured 16× slower at sf0.1."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "text", TX.words_of("text").alias("_w"),
        F.concat(F.col("text"), F.lit(" "), F.col("text")).alias("_t2"))
    # _w2 must be its own column: embedded in the shingle lambda it would
    # re-concat per element (same O(words²) trap as the text re-split)
    staged = staged.withColumn("_w2", F.concat("_w", "_w"))
    shingled = staged.select(
        "doc_id",
        # k=1 via shingles_of_words, not the raw _w: the size<k fallback
        # ([trim(text)]) is what the oracle's dup_ngram_ratio_sql(k=1)
        # applies on a zero-word doc — raw _w would divide 0/0 there
        TX.shingles_of_words("_w", "text", 1).alias("_s1"),
        TX.shingles_of_words("_w", "text", 3).alias("_s3"),
        TX.shingles_of_words("_w2", "_t2", 3).alias("_s3d"))

    def ratio(c):
        return F.round(1 - F.size(F.array_distinct(c)) / F.size(c), 6)

    return shingled.select(
        "doc_id",
        ratio(F.col("_s1")).alias("dup_word_ratio"),
        ratio(F.col("_s3")).alias("dup_3gram_ratio"),
        ratio(F.col("_s3d")).alias("dup_3gram_doubled"),
    )


_SPAN_DOCS = 150         # doc_id bound for the planted verbatim copies
_SPAN_K = 8              # duplicated-span shingle width


def q_dup_spans(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al. 2021 shape): verbatim
    copies of the first _SPAN_DOCS documents are planted at doc_id + 2M, so
    >= 2*_SPAN_DOCS rows provably score dup_cover_ratio 1.0, and any
    naturally shared boilerplate 8-gram exercises the partial-coverage
    interval-union path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") < _SPAN_DOCS).select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"), "text")
    return SP.dup_span_metrics(docs.unionByName(copies),
                               "text", "doc_id", k=_SPAN_K)


QUERIES = {
    "decontaminate": q_decontaminate,
    "dup_spans": q_dup_spans,
    "quality_filter": q_quality_filter,
    "repetition_metrics": q_repetition_metrics,
    "pipeline_e2e": q_pipeline_e2e,
    "stratified_sample": q_stratified_sample,
    "weighted_mixture": q_weighted_mixture,
    "doc_chunks": q_doc_chunks,
    "seq_pack": q_seq_pack,
    "train_split": q_train_split,
    "pii_redact": q_pii_redact,
    "tfidf_top": q_tfidf_top,
    "vocab_topk": q_vocab_topk,
    "embed_normalize": q_embed_normalize,
    "embed_quantize": q_embed_quantize,
}

ORACLES = {
    "dup_spans": SP.dup_span_metrics_sql(
        f"""(SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 2000000 AS doc_id, text FROM documents
             WHERE doc_id < {_SPAN_DOCS})""",
        "text", "doc_id", k=_SPAN_K),
    "quality_filter": SA.quantile_threshold_flags_sql(
        "documents", TX.quality_score_sql("text"), "doc_id",
        q=_QUALITY_Q, score_name="quality"),
    "decontaminate": DC.contamination_flags_sql(
        "documents",
        f"(SELECT text FROM documents WHERE doc_id < {_BENCH_DOCS})",
        "text", "doc_id", k=_DECON_K),
    "repetition_metrics": f"""
        SELECT doc_id,
               {TX.dup_ngram_ratio_sql('text', 1)} AS dup_word_ratio,
               {TX.dup_ngram_ratio_sql('text', 3)} AS dup_3gram_ratio,
               {TX.dup_ngram_ratio_sql("(text || ' ' || text)", 3)}
                   AS dup_3gram_doubled
        FROM documents
    """,
    "stratified_sample": SA.stratified_sample_sql(
        "documents", "lang", "doc_id", n_per_stratum=20,
        columns="doc_id, lang"),
    "weighted_mixture": SA.weighted_mixture_sql(
        {"head": ("(SELECT * FROM documents WHERE source IN "
                  f"({', '.join(repr(s) for s in _HEAD_SOURCES)}))", 0.7),
         "tail": ("(SELECT * FROM documents WHERE source NOT IN "
                  f"({', '.join(repr(s) for s in _HEAD_SOURCES)}))", 0.3)},
        "doc_id", columns="doc_id, source"),
    "pipeline_e2e": PL.prepare_training_corpus_sql(
        """(SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text FROM documents)""",
        "text", "doc_id"),
    "doc_chunks": CH.chunk_documents_sql(
        f"(SELECT doc_id, text FROM documents WHERE doc_id < {_CHUNK_DOCS})",
        "text", "doc_id", chunk_size=_CHUNK_SIZE, overlap=_OVERLAP),
    "seq_pack": CH.pack_sequences_sql(
        "documents", "doc_id", TX.token_count_sql("text"),
        budget=_PACK_BUDGET, n_buckets=_PACK_BUCKETS),
    "train_split": f"""
        SELECT doc_id, {split_assign_sql('doc_id')} AS split FROM documents
    """,
    "pii_redact": f"""
        SELECT doc_id,
               {TX.redact_pii_sql(f"(text || '{_PII_SUFFIX_SQL}')")}
                   AS clean_text
        FROM documents
    """,
    "tfidf_top": TI.tfidf_top_terms_sql(
        f"(SELECT doc_id, text FROM documents WHERE doc_id < {_TFIDF_DOCS})",
        "text", "doc_id", top_k=3),
    "vocab_topk": TI.build_vocab_sql(
        "documents", "text", "doc_id",
        min_df=_VOCAB_MIN_DF, size=_VOCAB_SIZE),
    "embed_normalize": EM.l2_normalize_digest_sql(
        "embeddings", "embedding", "vec_id"),
    "embed_quantize": EM.quantize_int8_sql(
        "embeddings", "embedding", "vec_id"),
}
