"""Extension queries batch 3: corpus-level curation operators.

Line-level dedup (boilerplate removal), unigram log-probability quality
scoring (KenLM-perplexity stand-in), embedding-space semantic dedup
(SemDeDup-shaped: bucket, then drop within-bucket high-cosine copies), and
per-source token-budget selection. All four are oracle-exact; the dedup
queries plant deterministic duplicates (same CTE derivation on both
engines) so the drop logic is exercised by hundreds of true positives, not
whatever the raw corpus happens to contain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.functions import text as TX
from datafusion_delta_sharing_spark.functions.text import token_count, token_count_sql
from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import collocations as CL
from datafusion_delta_sharing_spark.operators import corpus as CO
from datafusion_delta_sharing_spark.operators import corpusstats as CS
from datafusion_delta_sharing_spark.operators import dedup as DD
from datafusion_delta_sharing_spark.operators import sampling as SA
from datafusion_delta_sharing_spark.operators import similarity as SIM

_DEDUP_DOCS = 150        # doc subset for the line-dedup check
_DEDUP_VECS = 200        # vec subset for semantic dedup
_AUG_OFFSET = 1_000_000  # id offset for planted duplicate copies
_LINE_WORDS = 16
_COS_THRESHOLD = 0.95
_SIGN_DIMS = 8
_TOKEN_BUDGET = 2_000    # per-source token quota


def _docs_with_copies(spark, sf_dir):
    """Planted exact copies: every doc in the subset reappears verbatim at
    doc_id + _AUG_OFFSET, so every line of a copy deduplicates against the
    original (the copy keeps only its trailing short line if unique —
    verbatim copies keep nothing)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _DEDUP_DOCS).select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + F.lit(_AUG_OFFSET))
                         .alias("doc_id"), "text")
    return docs.unionByName(copies)


_DOCS_WITH_COPIES_SQL = f"""(
    SELECT doc_id, text FROM documents WHERE doc_id < {_DEDUP_DOCS}
    UNION ALL
    SELECT doc_id + {_AUG_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id < {_DEDUP_DOCS}
)"""


def q_line_dedup(spark, sf_dir):
    """Corpus-wide line dedup over the planted-copy corpus: every copy's
    lines collapse onto the original's, so ~half the corpus lines drop."""
    return CO.line_dedup(_docs_with_copies(spark, sf_dir), "text", "doc_id",
                         line_words=_LINE_WORDS)


def q_unigram_logprob(spark, sf_dir):
    """Mean unigram log-probability per document over the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return CO.unigram_logprob(docs, "text", "doc_id")


def q_semantic_dedup(spark, sf_dir):
    """Semantic dedup with planted identical vectors (cosine exactly 1.0,
    same sign bucket by construction): every planted copy must come back
    kept=false, every original kept=true unless the raw corpus itself has
    a near-dup in the bucket."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _DEDUP_VECS).select("vec_id", "embedding")
    copies = emb.select((F.col("vec_id") + F.lit(_AUG_OFFSET))
                        .alias("vec_id"), "embedding")
    return SIM.semantic_dedup(emb.unionByName(copies),
                              threshold=_COS_THRESHOLD,
                              sign_dims=_SIGN_DIMS)


_VECS_WITH_COPIES_SQL = f"""(
    SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_DEDUP_VECS}
    UNION ALL
    SELECT vec_id + {_AUG_OFFSET} AS vec_id, embedding
    FROM embeddings WHERE vec_id < {_DEDUP_VECS}
)"""


_CORPUS_DOCS = 300       # "yesterday's corpus" for incremental dedup
_BATCH_LO, _BATCH_HI = 300, 450   # genuinely-new docs in today's batch


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup — the everyday 100 TB operation: today's
    batch is deduped against yesterday's digest index without rescanning
    corpus text. The batch plants both failure modes: exact copies of 100
    corpus docs (must drop via the index anti-join) and a second copy of 50
    new docs (must collapse to one survivor with n_copies=2 within the
    batch)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < _CORPUS_DOCS)
    new = docs.filter((F.col("doc_id") >= _BATCH_LO)
                      & (F.col("doc_id") < _BATCH_HI))
    vs_corpus = (corpus.filter(F.col("doc_id") < 100)
                 .select((F.col("doc_id") + F.lit(_AUG_OFFSET))
                         .alias("doc_id"), "text"))
    in_batch = (new.filter(F.col("doc_id") < _BATCH_LO + 50)
                .select((F.col("doc_id") + F.lit(2 * _AUG_OFFSET))
                        .alias("doc_id"), "text"))
    incoming = new.unionByName(vs_corpus).unionByName(in_batch)
    index = DD.corpus_hash_index(corpus, "text", "doc_id")
    return DD.incremental_dedup(incoming, index, "text", "doc_id")


_INCOMING_SQL = f"""(
    SELECT doc_id, text FROM documents
    WHERE doc_id >= {_BATCH_LO} AND doc_id < {_BATCH_HI}
    UNION ALL
    SELECT doc_id + {_AUG_OFFSET} AS doc_id, text FROM documents
    WHERE doc_id < 100
    UNION ALL
    SELECT doc_id + {2 * _AUG_OFFSET} AS doc_id, text FROM documents
    WHERE doc_id >= {_BATCH_LO} AND doc_id < {_BATCH_LO + 50}
)"""

_CORPUS_SQL = f"(SELECT doc_id, text FROM documents WHERE doc_id < {_CORPUS_DOCS})"


def q_token_budget(spark, sf_dir):
    """Per-source token quota: best documents first (n_chars as the quality
    ordering — a real pipeline would plug in quality_score / logprob),
    greedy prefix within 2k tokens per source."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars",
        token_count("text").alias("n_tok"))
    return SA.token_budget_select(docs, "source", "doc_id", "n_tok",
                                  "n_chars", budget=_TOKEN_BUDGET)


def _shingles_sql(source_sql: str) -> str:
    """(sh) rows, multiplicity kept — the DuckDB mirror of
    operators/dedup.shingle_sets k=5 without the id column, derived from
    the same shared spelling as extensions._posts_cte."""
    from datafusion_delta_sharing_spark.harness.extensions import (
        _shingle_rows_sql)
    return f"SELECT sh FROM ({_shingle_rows_sql(source_sql)})"


QUERIES = {
    "line_dedup": q_line_dedup,
    "unigram_logprob": q_unigram_logprob,
    "semantic_dedup": q_semantic_dedup,
    "token_budget": q_token_budget,
    "dedup_incremental": q_dedup_incremental,
    "pmi_collocations": lambda spark, sf_dir: CL.pmi_collocations(
        load_table(spark, sf_dir, "documents"), "text", "doc_id",
        min_count=5, top_k=100),
    "grouped_quantiles": lambda spark, sf_dir: CS.grouped_quantiles(
        load_table(spark, sf_dir, "documents"), "source",
        token_count("text"), qs=(0.25, 0.5, 0.75, 0.95),
        score_name="n_tok"),
    "distinctive_terms": lambda spark, sf_dir: CS.distinctive_terms(
        load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en"),
        load_table(spark, sf_dir, "documents").filter(F.col("lang") != "en"),
        "text", "doc_id", min_count=10, top_k=50),
    "corpus_overlap": lambda spark, sf_dir: CS.corpus_overlap(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250),
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") >= 200),
        "text", "doc_id", k=5),
}

ORACLES = {
    "line_dedup": CO.line_dedup_sql(_DOCS_WITH_COPIES_SQL, "text", "doc_id",
                                    line_words=_LINE_WORDS),
    "unigram_logprob": CO.unigram_logprob_sql("documents", "text", "doc_id"),
    "semantic_dedup": SIM.semantic_dedup_sql(_VECS_WITH_COPIES_SQL,
                                             threshold=_COS_THRESHOLD,
                                             sign_dims=_SIGN_DIMS),
    "token_budget": SA.token_budget_select_sql(
        f"(SELECT doc_id, source, n_chars, {token_count_sql('text')} AS n_tok"
        f" FROM documents)",
        "source", "doc_id", "n_tok", "n_chars", budget=_TOKEN_BUDGET),
    "dedup_incremental": DD.incremental_dedup_sql(
        _INCOMING_SQL,
        DD.corpus_hash_index_sql(_CORPUS_SQL, "text", "doc_id"),
        "text", "doc_id"),
    "pmi_collocations": CL.pmi_collocations_sql(
        "documents", "text", "doc_id", min_count=5, top_k=100),
    "grouped_quantiles": CS.grouped_quantiles_sql(
        "documents", "source", token_count_sql("text"),
        qs=(0.25, 0.5, 0.75, 0.95), score_name="n_tok"),
    "distinctive_terms": CS.distinctive_terms_sql(
        "(SELECT * FROM documents WHERE lang = 'en')",
        "(SELECT * FROM documents WHERE lang != 'en')",
        "text", "doc_id", min_count=10, top_k=50),
    "corpus_overlap": CS.corpus_overlap_sql(
        _shingles_sql("documents WHERE doc_id < 250"),
        _shingles_sql("documents WHERE doc_id >= 200")),
}
