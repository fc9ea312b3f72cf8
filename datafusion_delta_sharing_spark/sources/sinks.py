"""Pipeline output sinks.

The sharing protocol itself is read-only (the reference has no write path —
SURVEY.md §2 Tier-A note), but a training-data pipeline must land its
outputs somewhere. Two scale-bearing writers:

* ``write_partitioned`` — hive-partitioned parquet, the layout downstream
  scans prune on (dynamic partition pruning, partition-wise listing);
* ``write_bucketed`` — bucketed table so later equi-joins/aggregations on
  the bucket key are co-located and skip the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_by: list[str],
                      mode: str = "overwrite",
                      max_records_per_file: int | None = None) -> None:
    """Write hive-partitioned parquet. ``maxRecordsPerFile`` bounds file
    size so a skewed partition value cannot produce one giant file."""
    writer = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def compact_files(spark, src_path: str, dst_path: str,
                  target_rows_per_file: int) -> int:
    """Rewrite a parquet dataset into ~target-sized files (the small-file
    problem: a streaming or per-batch writer leaves thousands of tiny
    files; at 100 TB the NameNode/listing and per-file open costs dominate
    the scan). File count is computed from the actual row count, and the
    rewrite is a round-robin repartition — a full shuffle, but the only
    scalable way to balance arbitrary skew in the input files; run it as
    the off-line maintenance job it is. Returns the output file count."""
    import os

    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        # in-place overwrite DESTROYS the dataset: the overwrite clears
        # the directory before the lazy repartition re-scan reads it —
        # the write fails AND the source is already gone (r5 review)
        raise ValueError(
            f"compact_files cannot rewrite in place ({src_path!r}): "
            "the overwrite deletes the source before the shuffled "
            "re-scan reads it; write to a new directory and swap")
    df = spark.read.parquet(src_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return n_files


def write_bucketed(df: DataFrame, table_name: str, bucket_by: str,
                   n_buckets: int = 16, sort_by: str | None = None,
                   mode: str = "overwrite") -> None:
    """Save as a bucketed (and optionally sorted) managed table. Joins and
    aggregations on ``bucket_by`` between tables bucketed the same way plan
    with ZERO Exchange — the co-location replaces the shuffle (verified in
    tests/test_sinks.py by plan inspection)."""
    writer = (df.write.mode(mode)
              .bucketBy(n_buckets, bucket_by))
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)
