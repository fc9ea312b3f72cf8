"""End-to-end training-data pipeline demo over the synthetic corpus.

Runs the full curation chain on /root/testdata/sf0.001 (override with
SPARK_GRAFT_SF_DIR): quality metrics -> PII redaction -> exact+near dedup ->
train/val/test split -> chunk -> pack -> stratified sample + mixture ->
TF-IDF vocabulary -> embedding quantization + ANN. Prints one summary line
per stage. Everything is lazy DataFrame composition; the only actions are
the final counts/shows.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_delta_sharing_spark.functions import text as TX  # noqa: E402
from datafusion_delta_sharing_spark.functions.splits import split_assign  # noqa: E402
from datafusion_delta_sharing_spark.operators import decontam as DC  # noqa: E402
from datafusion_delta_sharing_spark.operators import dedup as DD  # noqa: E402
from datafusion_delta_sharing_spark.operators import sampling as SA  # noqa: E402
from datafusion_delta_sharing_spark.operators import similarity as SIM  # noqa: E402
from datafusion_delta_sharing_spark.operators import tfidf as TI  # noqa: E402
from datafusion_delta_sharing_spark.operators.embeddings import quantize_int8  # noqa: E402
from datafusion_delta_sharing_spark.operators.pipeline import (  # noqa: E402
    prepare_training_corpus)
from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("pipeline-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = docs.count()
    print(f"== corpus: {n} documents, {emb.count()} embeddings ({sf_dir})")

    quality = docs.select("doc_id", TX.quality_score("text").alias("q"),
                          TX.lang_id("text").alias("lang_pred"))
    print("== quality: mean score",
          round(quality.agg(F.avg("q")).first()[0], 4))

    redacted = docs.select("doc_id", TX.redact_pii(F.col("text")).alias("text"))
    print("== pii: redacted column ready,", redacted.count(), "rows")

    rep = docs.select(TX.dup_ngram_ratio("text", k=3).alias("r"))
    print("== repetition: mean dup-3gram ratio",
          round(rep.agg(F.avg("r")).first()[0], 4))

    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    clean = DC.decontaminate(docs, bench, "text", "doc_id", k=8)
    print(f"== decontamination: {n - clean.count()} docs dropped for "
          "benchmark k-gram overlap")

    pairs = DD.ngram_jaccard_pairs(docs, "text", "doc_id", k=5, threshold=0.15)
    comp = DD.connected_components(
        docs.select(F.col("doc_id").alias("id")), pairs)
    n_comp = comp.select("component").distinct().count()
    print(f"== near-dup: {pairs.count()} candidate pairs, "
          f"{n_comp} clusters ({n - n_comp} docs would be dropped)")

    corpus = prepare_training_corpus(docs, "text", "doc_id",
                                     chunk_size=64, budget=1024, n_buckets=4)
    packs = corpus.agg(
        F.count("*").alias("chunks"),
        F.countDistinct("bucket", "pack_id").alias("packs")).first()
    print(f"== train corpus: {packs.chunks} chunks packed into "
          f"{packs.packs} {1024}-token packs")

    split_counts = {r["split"]: r["count"] for r in
                    docs.select(split_assign("doc_id").alias("split"))
                    .groupBy("split").count().collect()}
    print("== split:", split_counts)

    sample = SA.stratified_sample(docs, "lang", "doc_id", n_per_stratum=5)
    print("== stratified sample:", sample.count(), "docs across",
          sample.select("lang").distinct().count(), "languages")

    vocab = TI.build_vocab(docs, "text", "doc_id", min_df=2, size=10)
    top = [r.token for r in vocab.orderBy("rank").limit(5).collect()]
    print("== vocab top-5:", top)

    quant = quantize_int8(emb, "embedding", "vec_id")
    print("== embeddings: int8-quantized,",
          quant.filter(F.col("qmax") <= 127).count(), "rows within range")

    queries = emb.filter(F.col("vec_id") <= 3)
    topk = SIM.brute_force_topk(emb, queries, k=3)
    print("== ann: top-3 neighbours for 3 queries ->", topk.count(), "rows")

    spark.stop()
    print("pipeline demo complete")


if __name__ == "__main__":
    main()
