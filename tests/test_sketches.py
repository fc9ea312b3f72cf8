"""Sketch operators: Misra-Gries heavy hitters, bloom-prefiltered join,
frequency moments. The sketches bound intermediate state only — outputs
must equal the exact computation, which these tests verify directly."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.harness import load_table
from datafusion_delta_sharing_spark.operators import sketches as SK


def _exact_counts(df, col):
    rows = (df.filter(F.col(col).isNotNull())
            .groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).collect())
    return {r[col]: r["cnt"] for r in rows}


def test_heavy_hitters_equals_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    langs = docs.select("lang")
    n = langs.count()
    min_frac = 0.05
    exact = {k: v for k, v in _exact_counts(docs, "lang").items()
             if v >= -(-min_frac * n // 1)}
    got = {r["lang"]: r["cnt"]
           for r in SK.heavy_hitters(langs, "lang", min_frac).collect()}
    assert got == exact
    assert got  # non-vacuous: at least one heavy lang exists


def test_heavy_hitters_skewed_synthetic(spark):
    # 1000 rows of 'a' (50%), 600 'b' (30%), rest unique — across many
    # partitions so the per-partition pigeonhole actually engages.
    vals = (["a"] * 1000 + ["b"] * 600 + [f"u{i}" for i in range(400)])
    df = spark.createDataFrame(
        [(v,) for v in vals], "v string").repartition(16)
    got = {r["v"]: r["cnt"]
           for r in SK.heavy_hitters(df, "v", 0.25, capacity=8).collect()}
    assert got == {"a": 1000, "b": 600}


def test_heavy_hitters_null_and_validation(spark):
    df = spark.createDataFrame(
        [("x",), (None,), ("x",), (None,), (None,)], "v string")
    got = {r["v"]: r["cnt"]
           for r in SK.heavy_hitters(df, "v", 0.5).collect()}
    assert got == {"x": 2}  # nulls excluded from stream and threshold
    with pytest.raises(ValueError, match="min_frac"):
        SK.heavy_hitters(df, "v", 1.5)
    with pytest.raises(ValueError, match="capacity"):
        SK.heavy_hitters(df, "v", 0.01, capacity=10)


def test_misra_gries_partition_state_bounded():
    run = SK._misra_gries_partition("v", capacity=4)
    batches = [pd.DataFrame({"v": ["a"] * 50 + [f"x{i}" for i in range(30)]}),
               pd.DataFrame({"v": ["a"] * 50 + [f"y{i}" for i in range(30)]})]
    (out,) = list(run(iter(batches)))
    cand = out[out["_n_part"].isna()]
    assert len(cand) <= 4          # state never exceeds capacity
    assert "a" in set(cand["v"])   # the true majority item survives
    assert out["_n_part"].dropna().sum() == 160  # count row carries n


def test_bloom_join_stats(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    row = SK.bloom_prefilter_join_stats(
        lineitem, dim, "l_partkey", "p_partkey").collect()[0]
    true_match = lineitem.join(
        dim.select(F.col("p_partkey").alias("l_partkey")).distinct(),
        "l_partkey", "left_semi").count()
    assert row["n_fact"] == lineitem.count()
    assert row["n_true_match"] == true_match
    # no false negatives ever; false positives bounded by bucket density
    assert true_match <= row["n_pass_bloom"] <= row["n_fact"]


def test_bloom_join_empty_dim(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(F.lit(False))
    row = SK.bloom_prefilter_join_stats(
        lineitem, dim, "l_partkey", "p_partkey").collect()[0]
    assert row["n_pass_bloom"] == 0 and row["n_true_match"] == 0


def test_bloom_join_plan_has_no_fact_shuffle(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    plan = (SK.bloom_prefilter_join_stats(
        lineitem, dim, "l_partkey", "p_partkey")
        ._jdf.queryExecution().executedPlan().toString())
    # every semi-join against the bloom cells must be broadcast — the
    # fact side is filtered in place, never exchanged by key
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_freq_moments(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    row = SK.freq_moments(lineitem, "l_orderkey").collect()[0]
    counts = _exact_counts(lineitem, "l_orderkey")
    assert row["f1"] == sum(counts.values())
    assert row["f0"] == len(counts)
    assert row["f2"] == sum(c * c for c in counts.values())
    assert row["max_freq"] == max(counts.values())
    # F2 is exactly the self equi-join cardinality
    a = lineitem.select("l_orderkey")
    assert row["f2"] == a.join(a, "l_orderkey").count()
