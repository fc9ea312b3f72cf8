"""Document chunking and sequence packing for LLM training pipelines.

``chunk_documents`` splits each document into fixed-size token windows with
overlap (the standard pre-training shard shape); ``pack_sequences`` assigns
documents to fixed-token-budget packs with concat-and-chunk semantics.

Both are pure JVM-side DataFrame plans (split / sequence / explode / slice /
window aggregates — no Python UDFs), so they survive whole-stage codegen and
scale with a single shuffle. Each has a DuckDB SQL mirror generated from the
same constants for the correctness harness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from datafusion_delta_sharing_spark.functions.text import (
    WS_TOKEN_SPLIT, words_of)


def chunk_documents(docs: DataFrame, text_col: str, id_col: str,
                    chunk_size: int = 128, overlap: int = 32) -> DataFrame:
    """Sliding-window token chunks: windows of ``chunk_size`` whitespace
    tokens advancing by ``chunk_size - overlap``. The last window may be
    short; a document shorter than one window yields a single chunk.

    Plan shape: one narrow projection (split + sequence + explode) — no
    shuffle at all, so it scales linearly with input bytes. At 100 TB the
    only knob that matters is input partition size.
    """
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap
    # words_of, not a bare split: split emits phantom '' fragments at
    # tab/newline edges (trim strips spaces only), which the SQL mirror's
    # list_filter never sees — n_tokens would inflate and chunk bounds
    # shift on such text
    words = words_of(F.col(text_col))
    n = F.size(words)
    # number of stride steps whose window start lies within the document
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_size)) / F.lit(stride)) + 1)
    return (
        docs.select(F.col(id_col), words.alias("__words"), n.alias("__n"),
                    n_chunks.alias("__nc"))
        .select(F.col(id_col),
                F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))
                .alias("chunk_id"),
                F.col("__words"))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__words"),
                        F.col("chunk_id") * stride + 1, F.lit(chunk_size)),
                " ").alias("chunk_text"),
            F.size(F.slice(F.col("__words"),
                           F.col("chunk_id") * stride + 1, F.lit(chunk_size)))
            .cast("bigint").alias("n_tokens"))
    )


def chunk_documents_sql(source_sql: str, text_col: str, id_col: str,
                        chunk_size: int = 128, overlap: int = 32) -> str:
    """DuckDB mirror of :func:`chunk_documents` (1-based inclusive slices)."""
    stride = chunk_size - overlap
    words = f"list_filter(regexp_split_to_array(trim({text_col}), '{WS_TOKEN_SPLIT}'), x -> x != '')"
    return f"""
        SELECT {id_col}, CAST(chunk_id AS BIGINT) AS chunk_id,
               array_to_string(
                   words[chunk_id * {stride} + 1 :
                         chunk_id * {stride} + {chunk_size}], ' ') AS chunk_text,
               CAST(len(words[chunk_id * {stride} + 1 :
                              chunk_id * {stride} + {chunk_size}]) AS BIGINT)
                   AS n_tokens
        FROM (
            SELECT {id_col}, {words} AS words,
                   CASE WHEN len({words}) <= {chunk_size} THEN 1
                        ELSE CAST(ceil((len({words}) - {chunk_size})
                                       / {stride}.0) AS BIGINT) + 1
                   END AS nc
            FROM {source_sql}
        ), unnest(range(0, nc)) AS t(chunk_id)
    """


def pack_sequences(docs: DataFrame, id_col: str, token_count_col: str,
                   budget: int = 2048, n_buckets: int = 32,
                   bucket_expr: Column | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are routed to
    ``n_buckets`` independent streams (deterministically by id here; a
    production run would use a hash), ordered by id within the stream, and
    the running token total assigns each document a ``pack_id`` =
    floor(tokens-before-this-doc / budget) plus its offset inside the pack.

    One shuffle (the bucket window) regardless of scale; each bucket's
    window is processed by a single task, so ``n_buckets`` should be sized
    to the cluster's parallelism — the packing itself is O(docs) total.
    ``bucket_expr`` overrides the default ``id % n_buckets`` routing —
    callers whose ids share a factor with ``n_buckets`` (e.g. composite
    uids) MUST pass one, or the streams collapse onto a few buckets and
    the window degenerates toward a single reducer.
    """
    bucket = (bucket_expr.cast("int") if bucket_expr is not None
              else (F.col(id_col) % n_buckets).cast("int"))
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select(F.col(id_col), bucket.alias("bucket"),
                    F.col(token_count_col).alias("n_tokens"))
        .select(F.col(id_col), "bucket", "n_tokens",
                F.floor(prior / budget).cast("bigint").alias("pack_id"),
                (prior % budget).cast("bigint").alias("pack_offset"))
    )


def pack_sequences_sql(source_sql: str, id_col: str, token_count_expr: str,
                       budget: int = 2048, n_buckets: int = 32,
                       bucket_expr: str | None = None) -> str:
    """DuckDB mirror of :func:`pack_sequences`."""
    if bucket_expr is None:
        bucket_expr = f"{id_col} % {n_buckets}"
    return f"""
        SELECT {id_col}, bucket, n_tokens,
               CAST(floor(prior / {budget}) AS BIGINT) AS pack_id,
               CAST(prior % {budget} AS BIGINT) AS pack_offset
        FROM (
            SELECT {id_col}, bucket, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY bucket ORDER BY {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS prior
            FROM (
                SELECT {id_col},
                       CAST({bucket_expr} AS INTEGER) AS bucket,
                       {token_count_expr} AS n_tokens
                FROM {source_sql}
            )
        )
    """
