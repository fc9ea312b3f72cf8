"""End-to-end training-corpus preparation: the flagship composition of the
pipeline operators — quality filter → exact dedup → deterministic split →
token chunking → sequence packing — as one lazy DataFrame plan.

Chaining matters: Catalyst fuses the quality filter into the scan, the
dedup window and the packing window are the only two shuffles, and nothing
materializes in between. At 100 TB this runs as scan → window(digest) →
window(bucket) with all projections pipelined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_delta_sharing_spark.functions.splits import (
    split_assign, split_assign_sql)
from datafusion_delta_sharing_spark.functions.text import (
    quality_score, quality_score_sql)
from datafusion_delta_sharing_spark.operators.chunking import (
    chunk_documents, chunk_documents_sql,
    pack_sequences, pack_sequences_sql)

_UID_BASE = 100_000  # chunk_uid = doc_id * base + chunk_id (chunks/doc << base)


def prepare_training_corpus(docs: DataFrame, text_col: str, id_col: str,
                            quality_min: float = 0.3,
                            chunk_size: int = 128, overlap: int = 0,
                            budget: int = 2048, n_buckets: int = 8,
                            salt: str = "v1") -> DataFrame:
    """documents -> (doc_id, chunk_id, bucket, n_tokens, pack_id,
    pack_offset) for the train split, deduplicated and quality-filtered.

    Survivor choice is deterministic (lowest id per md5 digest), so the
    result is reproducible run-to-run — a requirement for training-data
    lineage. The digest window's groups are duplicate-sets (tiny); the
    packing window is bounded by ``n_buckets`` streams.
    """
    clean = docs.filter(quality_score(F.col(text_col)) >= quality_min)
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    deduped = (clean.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).drop("__rn"))
    train = deduped.filter(split_assign(id_col, salt=salt) == "train")
    chunks = chunk_documents(train, text_col, id_col,
                             chunk_size=chunk_size, overlap=overlap)
    with_uid = chunks.select(
        # cast BEFORE the multiply: an IntegerType id wraps silently past
        # ~21474 under non-ANSI int arithmetic, colliding chunk_uids
        (F.col(id_col).cast("long") * _UID_BASE
         + F.col("chunk_id")).alias("chunk_uid"),
        F.col("n_tokens").alias("n_tok"))
    # bucket by DOCUMENT, not chunk_uid % n_buckets: n_buckets divides
    # _UID_BASE, so uid % n_buckets == chunk_id % n_buckets and every
    # doc's chunk 0 would collapse into bucket 0 — one unbounded window
    # partition instead of n_buckets streams
    packed = pack_sequences(
        with_uid, "chunk_uid", "n_tok", budget=budget, n_buckets=n_buckets,
        bucket_expr=F.expr(f"(chunk_uid div {_UID_BASE}) % {n_buckets}"))
    # integral div, not float /: double rounding could flip the boundary
    return packed.select(
        F.expr(f"chunk_uid div {_UID_BASE}").alias(id_col),
        (F.col("chunk_uid") % _UID_BASE).alias("chunk_id"),
        "bucket", "n_tokens", "pack_id", "pack_offset")


def prepare_training_corpus_sql(source_sql: str, text_col: str, id_col: str,
                                quality_min: float = 0.3,
                                chunk_size: int = 128, overlap: int = 0,
                                budget: int = 2048, n_buckets: int = 8,
                                salt: str = "v1") -> str:
    """DuckDB mirror of :func:`prepare_training_corpus`."""
    train = f"""(
        SELECT {id_col}, {text_col} FROM (
            SELECT {id_col}, {text_col},
                   row_number() OVER (PARTITION BY md5({text_col})
                                      ORDER BY {id_col}) AS rn
            FROM {source_sql}
            WHERE {quality_score_sql(text_col)} >= {quality_min}
        ) WHERE rn = 1
          AND {split_assign_sql(id_col, salt=salt)} = 'train'
    )"""
    chunks = chunk_documents_sql(train, text_col, id_col,
                                 chunk_size=chunk_size, overlap=overlap)
    pack_src = f"""(
        SELECT CAST({id_col} AS BIGINT) * {_UID_BASE} + chunk_id AS chunk_uid, n_tokens
        FROM ({chunks})
    )"""
    packed = pack_sequences_sql(
        pack_src, "chunk_uid", "n_tokens", budget=budget,
        n_buckets=n_buckets,
        bucket_expr=f"(chunk_uid // {_UID_BASE}) % {n_buckets}")
    return f"""
        SELECT CAST(chunk_uid // {_UID_BASE} AS BIGINT) AS {id_col},
               CAST(chunk_uid % {_UID_BASE} AS BIGINT) AS chunk_id,
               bucket, n_tokens, pack_id, pack_offset
        FROM ({packed})
    """
