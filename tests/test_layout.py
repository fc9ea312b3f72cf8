"""Z-order layout: code correctness and physical skipping-stat tightness."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.operators import layout as LAY


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_code_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 63, 1000) for y in (0, 2, 7, 63, 999)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.select("x", "y",
                     LAY.morton_code("x", "y", bits=12).alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_morton(x, y, 12), (x, y)


def test_morton_code_property_sweep(spark):
    """Random coordinate sweep vs the reference interleave, one Spark job:
    hypothesis drives the coordinate choice, the frame evaluates all draws
    at once (per-example Spark jobs would take minutes)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 2**16 - 1),
                              st.integers(0, 2**16 - 1)),
                    min_size=1, max_size=8))
    def check(pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        got = [r.z for r in
               df.select(LAY.morton_code("x", "y", bits=16).alias("z"))
               .collect()]
        assert got == [_py_morton(x, y, 16) for x, y in pairs]

    check()


def test_zorder_write_tightens_both_dims(spark, tmp_path):
    """64x64 grid into 16 files: a linear sort on x leaves y spanning the
    full domain in every file; Z-order bounds both dims to ~a 16x16 tile."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"))

    zpath = str(tmp_path / "zorder")
    LAY.write_zordered(grid, zpath, "x", "y", n_files=16, bits=6)
    spans = (spark.read.parquet(zpath)
             .groupBy(F.input_file_name().alias("f"))
             .agg((F.max("x") - F.min("x")).alias("xs"),
                  (F.max("y") - F.min("y")).alias("ys"))
             .agg(F.avg("xs").alias("mx"), F.avg("ys").alias("my"),
                  F.count(F.lit(1)).alias("nf"))
             .collect()[0])
    assert spans.nf == 16
    # perfect tiling would give span 15 on both; allow boundary slack
    assert spans.mx <= 24, spans
    assert spans.my <= 24, spans

    # the linear-sort counterfactual: every file spans all of y
    lpath = str(tmp_path / "linear")
    (grid.repartitionByRange(16, "x").sortWithinPartitions("x")
     .write.parquet(lpath))
    lin = (spark.read.parquet(lpath)
           .groupBy(F.input_file_name().alias("f"))
           .agg((F.max("y") - F.min("y")).alias("ys"))
           .agg(F.avg("ys").alias("my")).collect()[0])
    assert lin.my >= 60  # y stats are useless for pruning
    assert spans.my < lin.my / 2


def test_zorder_bucket_stats_partition_rows(spark):
    """Buckets cover all rows exactly once and are z-contiguous (disjoint
    row counts summing to the input size; ntile balance within 1)."""
    df = spark.range(1000).select(
        (F.col("id") % 32).alias("x"), (F.col("id") % 57).alias("y"),
        F.col("id").alias("i"))
    stats = LAY.zorder_bucket_stats(df, "x", "y", "i",
                                    n_buckets=8, bits=6).collect()
    assert len(stats) == 8
    assert sum(r.n_rows for r in stats) == 1000
    assert max(r.n_rows for r in stats) - min(r.n_rows for r in stats) <= 1
