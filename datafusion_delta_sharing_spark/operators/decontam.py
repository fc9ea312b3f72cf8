"""Benchmark decontamination: flag/drop corpus documents that share any
word k-gram with an evaluation/benchmark set — the standard pre-training
hygiene step (test-set leakage makes benchmark numbers meaningless).

Scale posture: the benchmark side is tiny relative to the corpus (eval
suites are MBs against 100 TB), so its distinct shingle set is broadcast
and the corpus is probed with a broadcast left-semi join — the corpus is
never shuffled. Only the matched document ids (a corpus-overlap-sized
set) go through a distinct shuffle before being joined back.

The DuckDB mirrors are generated from the same k so the Spark plan and
the oracle SQL cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datafusion_delta_sharing_spark.functions.text import (
    WS_TOKEN_SPLIT,
    shingles_of_words,
    words_of,
)


def _distinct_shingles(df: DataFrame, text_col: str, k: int,
                       *keep: str) -> DataFrame:
    """(keep..., sh) rows with per-document-distinct word k-shingles."""
    return (
        df.select(*keep, F.col(text_col).alias("_txt"),
                  words_of(text_col).alias("_words"))
        .select(*keep, F.explode(F.array_distinct(
            shingles_of_words("_words", "_txt", k))).alias("sh"))
    )


def _shingles_sql(source_sql: str, text_col: str, k: int,
                  select: str) -> str:
    """DuckDB mirror of :func:`_distinct_shingles` (same <k fallback)."""
    words = f"list_filter(regexp_split_to_array(trim({text_col}), '{WS_TOKEN_SPLIT}'), x -> x != '')"
    return f"""
        SELECT DISTINCT {select}, sh FROM (
            SELECT {select},
                   CASE WHEN len(words) < {k} THEN [trim({text_col})]
                        ELSE list_transform(range(1, len(words) - {k} + 2),
                             i -> array_to_string(words[i:i+{k - 1}], ' '))
                   END AS shs
            FROM (SELECT {select}, {text_col}, {words} AS words
                  FROM {source_sql})
        ), unnest(shs) AS t(sh)
    """


def _hit_ids(corpus: DataFrame, benchmark: DataFrame,
             text_col: str, id_col: str, k: int) -> DataFrame:
    """Distinct corpus ids sharing any word k-gram with the benchmark —
    the ONE probe pipeline behind both the flag and drop forms (two
    hand-synced copies would let 'flag' and 'drop' disagree on which
    documents are contaminated). The benchmark shingle set is broadcast;
    the corpus-side probe is a broadcast left-semi join (no corpus
    shuffle), and only the matched ids go through a distinct shuffle."""
    corpus_sh = _distinct_shingles(corpus, text_col, k, id_col)
    bench_sh = (_distinct_shingles(benchmark, text_col, k)
                .select("sh").distinct())
    return (corpus_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
            .select(id_col).distinct())


def contamination_flags(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """(id, contaminated) for every corpus document: contaminated iff the
    document shares at least one word ``k``-gram with any benchmark text
    (scale shape: see :func:`_hit_ids`)."""
    hits = _hit_ids(corpus, benchmark, text_col, id_col, k).withColumn(
        "_hit", F.lit(True))
    return (
        corpus.join(hits, id_col, "left")
        .select(F.col(id_col),
                F.coalesce(F.col("_hit"), F.lit(False)).alias("contaminated"))
    )


def contamination_flags_sql(corpus_sql: str, bench_sql: str,
                            text_col: str, id_col: str, k: int = 8) -> str:
    """DuckDB mirror of :func:`contamination_flags`."""
    corpus_sh = _shingles_sql(corpus_sql, text_col, k, id_col)
    bench_sh = _shingles_sql(bench_sql, text_col, k, "1 AS one")
    # coalesce(IN, FALSE): a NULL corpus id makes `NULL IN (non-empty)`
    # NULL, where the Spark side's left join + coalesce yields false
    return f"""
        SELECT {id_col},
               coalesce({id_col} IN (
                   SELECT DISTINCT {id_col} FROM ({corpus_sh})
                   WHERE sh IN (SELECT sh FROM ({bench_sh}))
               ), FALSE) AS contaminated
        FROM {corpus_sql}
    """


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """Corpus rows that share no word ``k``-gram with the benchmark set —
    the drop-contaminated composition of :func:`contamination_flags`
    (same :func:`_hit_ids` probe, anti-joined instead of flagged)."""
    return corpus.join(_hit_ids(corpus, benchmark, text_col, id_col, k),
                       id_col, "left_anti")
