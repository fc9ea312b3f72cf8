"""Profiling / data-quality operators on planted frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.operators import profiling as PR


def _frame(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, None, -5.0), (3, "a", 999.0)],
        "id long, tag string, score double")


def test_table_profile_counts(spark):
    out = {r.column_name: r for r in
           PR.table_profile(_frame(spark), ["id", "tag"]).collect()}
    assert out["id"].n_rows == 4
    assert out["id"].n_nulls == 0
    assert out["id"].n_distinct == 3
    assert (out["id"].min_val, out["id"].max_val) == ("1", "3")
    assert out["tag"].n_nulls == 1
    assert out["tag"].n_distinct == 2  # countDistinct skips NULL
    assert out["tag"].min_val == "a"


def test_table_profile_numeric_minmax_not_lexicographic(spark):
    """min/max must aggregate in native type: string-cast-first would
    report max '9' for values spanning digit widths (code-review catch)."""
    df = spark.createDataFrame([(9,), (10,), (60000,)], "v long")
    row = PR.table_profile(df, ["v"]).collect()[0]
    assert (row.min_val, row.max_val) == ("9", "60000")


def test_quality_checks_planted_violations(spark):
    out = {r.check_name: (r.n_violations, r.passed) for r in
           PR.quality_checks(
               _frame(spark),
               not_null=["id", "tag"],
               unique=["id"],
               accepted_values={"tag": ["a", "b"]},
               ranges={"score": (0.0, 100.0)}).collect()}
    assert out["not_null:id"] == (0, True)
    assert out["not_null:tag"] == (1, False)
    assert out["unique:id"] == (2, False)       # both rows of the dup pair
    assert out["accepted_values:tag"] == (0, True)  # NULL is not a violation
    assert out["range:score"] == (2, False)     # -5 and 999


def test_histogram_clamps_edges(spark):
    df = spark.range(100).select((F.col("id") * 1.0).alias("v"))
    out = {r.bucket: r.n for r in
           PR.equi_width_histogram(df, "v", 20.0, 80.0, 3).collect()}
    # [20,40) -> bucket 0 plus clamped 0..19; [40,60) -> 1; rest clamp to 2
    assert out == {0: 40, 1: 20, 2: 40}
    assert sum(out.values()) == 100


def test_skew_report_flags_hot_key(spark):
    rows = [(1, "x") for _ in range(90)] + [(i, "y") for i in range(2, 12)]
    df = spark.createDataFrame(rows, "k long, v string")
    out = {r.column_name: r for r in
           PR.skew_report(df, ["k", "v"]).collect()}
    assert out["k"].n_rows == 100
    assert out["k"].n_distinct == 11
    assert out["k"].max_freq == 90   # the skewed key
    assert out["v"].max_freq == 90


def test_contingency_marginals_sum(spark):
    rows = [("a", "p"), ("a", "p"), ("a", "q"), ("b", "q")]
    df = spark.createDataFrame(rows, "r string, c string")
    out = {(x.r, x.c): x for x in
           PR.contingency_table(df, "r", "c").collect()}
    cell = out[("a", "p")]
    assert (cell.observed, cell.row_total, cell.col_total, cell.n) == (2, 3, 2, 4)
    assert sum(x.observed for x in out.values()) == 4


def test_quantile_bin_quartiles(spark):
    from datafusion_delta_sharing_spark.operators.sampling import quantile_bin

    # scores 1..100: thresholds 25/50/75 -> bins 0..3 of 25 each
    df = spark.range(1, 101).select(F.col("id"),
                                    F.col("id").cast("double").alias("s"))
    out = {r.id: r.bin for r in
           quantile_bin(df, F.col("s"), "id").collect()}
    from collections import Counter
    assert Counter(out.values()) == {0: 25, 1: 25, 2: 25, 3: 25}
    assert out[25] == 0 and out[26] == 1    # threshold value stays below
    assert out[75] == 2 and out[76] == 3
