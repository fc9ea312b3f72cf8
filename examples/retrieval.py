"""Retrieval + data-selection demo over the synthetic corpus.

Runs the r6 retrieval stack on /root/testdata/sf0.001 (override with
SPARK_GRAFT_SF_DIR): BM25 keyword search -> DSIR importance selection
against a target slice -> sparse TF-IDF cosine near-neighbor pairs ->
BPE merge-pair statistics. One summary line per stage; everything is
lazy DataFrame composition.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_delta_sharing_spark.harness import load_table  # noqa: E402
from datafusion_delta_sharing_spark.operators.retrieval import (  # noqa: E402
    bm25_scores, dsir_logratio, sparse_cosine_pairs)
from datafusion_delta_sharing_spark.operators.tfidf import (  # noqa: E402
    bpe_pair_counts)
from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("retrieval", cpus=4)
    docs = load_table(spark, sf_dir, "documents")

    print("== BM25 top-5 for query {dup, merge, window, hash} ==")
    bm25_scores(docs, "text", "doc_id", ["dup", "merge", "window", "hash"]) \
        .orderBy(F.desc("score"), "doc_id").limit(5).show()

    print("== DSIR: top-5 pool docs most like source 'src18' ==")
    dsir_logratio(docs, "text", "doc_id", F.col("source") == "src18") \
        .orderBy(F.desc("logratio"), "doc_id").limit(5).show()

    print("== sparse TF-IDF cosine: top-5 most similar pairs ==")
    sparse_cosine_pairs(docs, "text", "doc_id", max_doc_frac=0.78,
                        top_k=5).show()

    print("== BPE merge candidates (round 1): top-5 pairs ==")
    bpe_pair_counts(docs, "text", top_k=5).show()

    spark.stop()


if __name__ == "__main__":
    main()
