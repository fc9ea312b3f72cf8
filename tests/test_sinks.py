"""Sink tests: partitioned parquet round-trip + pruning, bucketed join
without a shuffle."""

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.sources.sinks import (
    compact_files,
    write_bucketed,
    write_partitioned,
)


def test_compact_files_reduces_count_and_preserves_rows(spark, tmp_path):
    src, dst = str(tmp_path / "tiny"), str(tmp_path / "compacted")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    df.repartition(64).write.parquet(src)  # the small-file mess
    n_files = compact_files(spark, src, dst, target_rows_per_file=2_500)
    assert n_files == 4
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert out.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2
    import glob
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 4


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "yr", F.year("o_orderdate"))
    out = str(tmp_path / "orders_by_year")
    write_partitioned(orders, out, ["yr"], max_records_per_file=100_000)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    one_year = back.filter(F.col("yr") == 1996)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan  # directory-level pruning
    assert one_year.count() == orders.filter("yr = 1996").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, sort_by="l_orderkey")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                   "orders_bucketed", "l_orderkey", 8, sort_by="l_orderkey")
    # disable broadcast so the join shape (SMJ) exposes whether a shuffle
    # is needed — at real scale neither side broadcasts anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucketing replaced shuffle
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_compact_files_refuses_in_place(spark, tmp_path):
    """In-place compaction destroys the dataset: overwrite clears the
    directory before the lazy repartition re-scan reads it (r5 review)."""
    import pytest

    src = str(tmp_path / "data")
    spark.range(100).write.parquet(src)
    with pytest.raises(ValueError, match="in place"):
        compact_files(spark, src, src, target_rows_per_file=10)
    # and the data is still there
    assert spark.read.parquet(src).count() == 100
