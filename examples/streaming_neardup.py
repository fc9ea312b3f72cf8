"""Streaming near-duplicate dedup demo: incremental MinHash-LSH over an
ingest stream (the lossy-candidate counterpart of incremental_ingest.py's
exact digest index).

A 100 TB corpus is never re-compared from scratch — each arriving batch
computes shingle→minhash→band signatures, probes them against a PERSISTED
band index with one (band, band-hash) equi-join, verifies true Jaccard on
the collisions only, and appends its own signatures to the index. The
probe cost per batch is batch-size × collision rate, independent of how
big the corpus has grown.

This script streams /root/testdata/sf0.001 documents (plus planted
near-copies, suffix-edited so exact dedup would MISS them) through
streaming/minhash_dedup.py in three micro-batches, then shows:

* the flagged duplicates equal the batch ``minhash_lsh_pairs`` dup set —
  the stream and batch operators share their banding and verify code, so
  parity is structural;
* exact dedup over the same corpus flags nothing (the copies are
  near-dups, not byte-dups) — why the LSH tier exists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_delta_sharing_spark.operators import dedup as DD  # noqa: E402
from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402
from datafusion_delta_sharing_spark.streaming.minhash_dedup import (  # noqa: E402
    stream_minhash_dedup_flags,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
N_DOCS = 40


def main() -> None:
    spark = get_spark("streaming-neardup-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < N_DOCS).select("doc_id", "text"))
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                         F.concat("text", F.lit(" xq yq zq wq")).alias("text"))
    corpus = docs.unionByName(copies)

    print(f"== corpus: {N_DOCS} docs + {N_DOCS} suffix-edited near-copies ==")

    flagged = stream_minhash_dedup_flags(
        spark, corpus, "text", "doc_id", n_slices=3, threshold=0.15)
    n_flagged = flagged.count()
    print(f"streaming pass flagged {n_flagged} near-duplicates "
          f"(3 micro-batches, persisted band index probed per batch)")
    flagged.orderBy("doc_id").show(5)

    batch = (DD.minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.15)
             .select(F.col("id_b").alias("doc_id")).distinct())
    only_stream = flagged.join(batch, "doc_id", "left_anti").count()
    only_batch = batch.join(flagged, "doc_id", "left_anti").count()
    print(f"parity vs batch minhash_lsh_pairs: stream-only={only_stream}, "
          f"batch-only={only_batch} (both 0 = identical dup sets)")

    exact = (DD.exact_dedup_stats(corpus, "text", "doc_id")
             .filter(F.col("n_copies") > 1).count())
    print(f"exact (digest) dedup over the same corpus finds {exact} "
          f"duplicate groups — the suffix edits defeat it; near-dup "
          f"detection needs the LSH tier")

    assert only_stream == 0 and only_batch == 0
    assert n_flagged > 0
    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
