"""Exact duplicated-substring-span detection ("Deduplicating Training Data
Makes Language Models Better", Lee et al. 2021): find every word k-gram that
occurs in at least ``min_docs`` distinct documents, then score each document
by how much of it is covered by such cross-document spans (interval-union
coverage, so overlapping duplicated k-grams are not double-counted).

This is the exact-substring companion to the sketch-based near-dup operators
in :mod:`.dedup` — it catches verbatim boilerplate, licence headers, and
copy-pasted passages that document-level MinHash misses because the rest of
the document differs.

Scale posture (100 TB):
* The global shingle exchange carries ``(xxhash64(shingle), doc_id)`` —
  8-byte hashes, never the shingle strings — and is immediately reduced by
  a distinct + count, so shuffle volume is ~16 bytes per corpus word.
* The duplicated-hash set flows into a semi join against the position
  stream (same hash partitioning, no re-shuffle of text).
* Per-document coverage is a single window over positions (one shuffle on
  doc_id) — no driver-side state, no collect.
* A 64-bit hash collision would merge two unrelated shingles; at 10^12
  corpus shingles the expected number of colliding pairs is ~0.03, and a
  collision can only *overstate* duplication by one span.

The DuckDB mirror groups by the shingle string itself (DuckDB has no
xxhash64); outputs agree unless a 64-bit collision occurs in the corpus
under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from datafusion_delta_sharing_spark.functions.text import (
    WS_TOKEN_SPLIT,
    words_of,
)


def dup_span_metrics(corpus: DataFrame, text_col: str, id_col: str,
                     k: int = 8, min_docs: int = 2) -> DataFrame:
    """Per-document duplicated-span metrics.

    Returns one row per input document:

    * ``n_words`` — whitespace word count;
    * ``n_dup_shingles`` — word ``k``-grams of this document that occur in
      ``>= min_docs`` distinct documents (count includes this one);
    * ``dup_shingle_ratio`` — that count over the document's shingle count;
    * ``dup_cover_ratio`` — fraction of the document's words covered by the
      union of duplicated-span intervals (merged, not double-counted).

    Documents shorter than ``k`` words produce no shingles and score 0 —
    whole-document duplicates at that length are the exact-dedup
    operator's job (``dedup.exact_dedup``), not a span signal.
    """
    sized = corpus.select(
        F.col(id_col).alias("_id"),
        words_of(text_col).alias("_w"),
    ).select("_id", F.size("_w").alias("_nw"), "_w")

    # (doc, pos, hash) for every k-shingle; pos is the 0-based word index
    # the span starts at, so the span covers words [pos, pos + k).
    pos = (
        sized.filter(F.col("_nw") >= k)
        .select(
            "_id",
            F.posexplode(
                F.transform(F.sequence(F.lit(1), F.col("_nw") - k + 1),
                            lambda i: F.array_join(F.slice("_w", i, F.lit(k)),
                                                   " "))
            ).alias("_pos", "_sh"),
        )
        .select("_id", "_pos", F.xxhash64("_sh").alias("_h"))
    )

    dup_hashes = (
        pos.select("_id", "_h").distinct()
        .groupBy("_h").agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
    )
    hits = pos.join(dup_hashes, "_h", "left_semi")

    # Interval-union coverage: spans all have length k and positions are
    # strictly increasing within a document, so the running max of span
    # ends clips each span to its unseen suffix.
    prev = Window.partitionBy("_id").orderBy("_pos").rowsBetween(
        Window.unboundedPreceding, -1)
    contrib = hits.select(
        "_id",
        (F.col("_pos") + k
         - F.greatest(F.col("_pos"),
                      F.coalesce(F.max(F.col("_pos") + k).over(prev),
                                 F.lit(0)))).alias("_c"),
    )
    cov = contrib.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_ndup"),
        F.sum("_c").alias("_cover"),
    )

    return (
        sized.select("_id", "_nw")
        .join(cov, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_nw").cast("bigint").alias("n_words"),
            F.coalesce(F.col("_ndup"), F.lit(0)).cast("bigint")
             .alias("n_dup_shingles"),
            F.round(F.coalesce(F.col("_ndup"), F.lit(0))
                    / F.greatest(F.col("_nw") - k + 1, F.lit(1)), 6)
             .alias("dup_shingle_ratio"),
            F.round(F.coalesce(F.col("_cover"), F.lit(0))
                    / F.greatest(F.col("_nw"), F.lit(1)), 6)
             .alias("dup_cover_ratio"),
        )
    )


def dup_span_metrics_sql(source_sql: str, text_col: str, id_col: str,
                         k: int = 8, min_docs: int = 2) -> str:
    """DuckDB mirror of :func:`dup_span_metrics` (grouping by the shingle
    string where Spark groups by its xxhash64)."""
    return f"""
        WITH sized AS (
            SELECT {id_col} AS _id,
                   list_filter(regexp_split_to_array(trim({text_col}),
                                         '{WS_TOKEN_SPLIT}'), x -> x != '') AS _w
            FROM {source_sql}
        ), sized2 AS (
            SELECT _id, len(_w) AS _nw, _w FROM sized
        ), pos AS (
            SELECT _id, i - 1 AS _pos,
                   array_to_string(_w[i:i+{k - 1}], ' ') AS _sh
            FROM sized2, unnest(range(1, _nw - {k} + 2)) AS t(i)
            WHERE _nw >= {k}
        ), dup AS (
            SELECT _sh FROM (SELECT DISTINCT _id, _sh FROM pos)
            GROUP BY _sh HAVING count(*) >= {min_docs}
        ), hits AS (
            SELECT _id, _pos FROM pos
            WHERE _sh IN (SELECT _sh FROM dup)
        ), contrib AS (
            SELECT _id,
                   _pos + {k} - greatest(_pos, coalesce(max(_pos + {k}) OVER (
                       PARTITION BY _id ORDER BY _pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0)) AS _c
            FROM hits
        ), cov AS (
            SELECT _id, count(*) AS _ndup, sum(_c) AS _cover
            FROM contrib GROUP BY _id
        )
        SELECT s._id AS {id_col},
               CAST(s._nw AS BIGINT) AS n_words,
               CAST(coalesce(c._ndup, 0) AS BIGINT) AS n_dup_shingles,
               round(coalesce(c._ndup, 0)
                     / greatest(s._nw - {k} + 1, 1), 6) AS dup_shingle_ratio,
               round(coalesce(c._cover, 0)
                     / greatest(s._nw, 1), 6) AS dup_cover_ratio
        FROM sized2 s LEFT JOIN cov c ON s._id = c._id
    """
