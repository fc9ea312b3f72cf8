"""Approximate string join (entity matching): n-gram blocking + edit
distance verify.

The scalable shape for "join rows whose keys are *almost* equal": exploding
each side into its character n-grams and equi-joining on the gram turns an
O(n*m) all-pairs comparison into a hash-partitioned candidate join; the
expensive Levenshtein DP runs only on candidate pairs. Recall is exact when
``min(len) >= gram * (max_dist + 1)`` (an edit destroys at most ``gram``
grams, so at least one of the ``len - gram + 1`` grams survives
``max_dist`` edits); shorter strings need a smaller ``gram``.

Skew: ubiquitous grams (a shared prefix across the whole table) make hot
join keys — ``max_gram_freq`` drops grams above a document frequency, the
same posting-list cut as dedup.ngram_jaccard_pairs; the SQL mirror applies
the identical cut so the harness check stays hash-exact.

Everything is JVM-side (sequence/transform higher-order fns, built-in
levenshtein) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _gram_posting(df: DataFrame, id_col: str, col: str, side: str,
                  gram: int) -> DataFrame:
    """(id, gram) distinct posting list of lowercase character n-grams."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({col}) - {gram - 1}, 1)),"
        f" i -> substr(lower({col}), i, {gram}))")
    return (df.select(F.col(id_col).alias(f"{side}_id"),
                      F.length(col).alias(f"{side}_len"),
                      F.explode(F.array_distinct(grams)).alias("gram")))


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_id: str, left_col: str,
               right_id: str, right_col: str,
               max_dist: int = 2, gram: int = 3,
               max_gram_freq: int | None = None) -> DataFrame:
    """(l_id, r_id, dist) for all pairs with levenshtein <= max_dist that
    share a surviving n-gram. Candidate generation is an equi-join on the
    gram (shuffle by gram — scales); a length-band filter
    |len_l - len_r| <= max_dist prunes candidates before the DP verify."""
    lg = _gram_posting(left, left_id, left_col, "l", gram)
    rg = _gram_posting(right, right_id, right_col, "r", gram)
    if max_gram_freq is not None:
        freq = (lg.groupBy("gram")
                .agg(F.countDistinct("l_id").alias("_df"))
                .filter(F.col("_df") <= max_gram_freq)
                .select("gram"))
        lg = lg.join(freq, "gram")
        rg = rg.join(freq, "gram")
    cand = (lg.join(rg, "gram")
            .filter(F.abs(F.col("l_len") - F.col("r_len")) <= max_dist)
            .select("l_id", "r_id").distinct())
    lv = left.select(F.col(left_id).alias("l_id"),
                     F.lower(F.col(left_col)).alias("_ltxt"))
    rv = right.select(F.col(right_id).alias("r_id"),
                      F.lower(F.col(right_col)).alias("_rtxt"))
    return (cand.join(lv, "l_id").join(rv, "r_id")
            .withColumn("dist", F.levenshtein("_ltxt", "_rtxt"))
            .filter(F.col("dist") <= max_dist)
            .select("l_id", "r_id", "dist"))


def fuzzy_join_sql(left_sql: str, right_sql: str,
                   left_id: str, left_col: str,
                   right_id: str, right_col: str,
                   max_dist: int = 2, gram: int = 3,
                   max_gram_freq: int | None = None) -> str:
    """DuckDB mirror: same blocking, length band, df-cut, and levenshtein
    verify. Gram positions come from a correlated
    ``unnest(generate_series(...))`` bounded by each string's own length —
    no constant position cap, so arbitrarily long keys keep their tail
    grams exactly like the Spark side's ``sequence``/``transform``."""
    def posting(src, idc, c, side):
        return f"""(
        SELECT DISTINCT {side}_id, {side}_len,
               substr(txt, i, {gram}) AS gram
        FROM (
            SELECT t.{idc} AS {side}_id, length(t.{c}) AS {side}_len,
                   lower(t.{c}) AS txt,
                   unnest(generate_series(
                       1, greatest(length(t.{c}) - {gram - 1}, 1))) AS i
            FROM {src} t)
        )"""
    lg, rg = posting(left_sql, left_id, left_col, "l"), posting(
        right_sql, right_id, right_col, "r")
    cut = ""
    if max_gram_freq is not None:
        cut = f""", kept AS (
        SELECT gram FROM lg GROUP BY gram
        HAVING count(DISTINCT l_id) <= {max_gram_freq})"""
        lg_src = "(SELECT lg.* FROM lg JOIN kept USING (gram))"
        rg_src = "(SELECT rg.* FROM rg JOIN kept USING (gram))"
    else:
        lg_src, rg_src = "lg", "rg"
    return f"""
    WITH lg AS (SELECT * FROM {lg}), rg AS (SELECT * FROM {rg}){cut},
    cand AS (
        SELECT DISTINCT l.l_id, r.r_id
        FROM {lg_src} l JOIN {rg_src} r USING (gram)
        WHERE abs(l.l_len - r.r_len) <= {max_dist}
    )
    SELECT c.l_id, c.r_id,
           levenshtein(lower(lt.{left_col}), lower(rt.{right_col})) AS dist
    FROM cand c
    JOIN {left_sql} lt ON lt.{left_id} = c.l_id
    JOIN {right_sql} rt ON rt.{right_id} = c.r_id
    WHERE levenshtein(lower(lt.{left_col}), lower(rt.{right_col})) <= {max_dist}
    """
