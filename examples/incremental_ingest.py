"""Incremental ingest loop demo: the production shape of corpus growth.

A 100 TB corpus is never re-deduplicated from scratch — each day's batch
is deduped against a persisted digest index, survivors are appended to
both the corpus and the index, and the index is bucketed by digest so the
daily anti-join never shuffles the accumulated side. This script runs
three simulated "days" over /root/testdata/sf0.001 (override with
SPARK_GRAFT_SF_DIR), planting cross-day duplicates to show them dropping,
then Z-orders the final corpus layout for two-column file skipping.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_delta_sharing_spark.operators import dedup as DD  # noqa: E402
from datafusion_delta_sharing_spark.operators import layout as LAY  # noqa: E402
from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    n = docs.count()
    third = n // 3

    # day 0 bootstrap: first third is the existing corpus
    corpus = docs.filter(F.col("doc_id") < third)
    index = DD.corpus_hash_index(corpus, "text", "doc_id")
    print(f"day 0: corpus={corpus.count()} index={index.count()}")

    for day, (lo, hi) in enumerate(
            [(third, 2 * third), (2 * third, n)], start=1):
        fresh = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        # every batch drags in re-crawled copies of older docs (ids offset
        # so they look new to anything but content hashing)
        recrawled = (docs.filter(F.col("doc_id") < lo // 2)
                     .select((F.col("doc_id") + 10_000_000 * day)
                             .alias("doc_id"), "text"))
        batch = fresh.unionByName(recrawled)
        survivors = DD.incremental_dedup(batch, index, "text", "doc_id")
        n_batch, n_surv = batch.count(), survivors.count()
        print(f"day {day}: batch={n_batch} survivors={n_surv} "
              f"dropped={n_batch - n_surv}")
        index = index.select("text_md5").unionByName(
            survivors.select("text_md5"))

    print(f"final index: {index.count()} distinct digests")

    # layout maintenance: Z-order the corpus so scans filtered on either
    # doc_id range or length get tight file stats
    with tempfile.TemporaryDirectory() as tmp:
        sized = docs.withColumn("n_chars", F.length("text"))
        LAY.write_zordered(
            sized.withColumn("len_bucket", F.col("n_chars") % 4096),
            f"{tmp}/corpus_z", "doc_id", "len_bucket", n_files=8)
        per_file = (spark.read.parquet(f"{tmp}/corpus_z")
                    .groupBy(F.input_file_name())
                    .agg(F.min("doc_id"), F.max("doc_id"))
                    .count())
        print(f"z-ordered corpus written: {per_file} files")


if __name__ == "__main__":
    main()
