"""Streaming incremental ingest: foreachBatch + the digest index.

The streaming form of the daily dedup loop (examples/incremental_ingest):
each microbatch anti-joins the persisted digest index and appends its
survivors — foreachBatch is the sink tier that lets a streaming query run
arbitrary batch DataFrame logic transactionally per microbatch.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from datafusion_delta_sharing_spark.operators import dedup as DD


def test_foreachbatch_incremental_dedup(spark, tmp_path):
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "index")

    batch1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string")
    batch2 = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "beta"), (13, "delta")],
        "doc_id long, text string")
    # two files with distinct mtimes -> two deterministic microbatches
    batch1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    batch2.coalesce(1).write.mode("append").parquet(src)

    # seed an empty index with the right schema
    (spark.createDataFrame([], "text_md5 string, keep_id long")
     .write.mode("overwrite").parquet(idx))

    def ingest(batch_df, batch_id):
        index = batch_df.sparkSession.read.parquet(idx)
        surv = DD.incremental_dedup(batch_df, index, "text", "doc_id")
        (surv.select("text_md5", F.col("keep_id"))
         .write.mode("append").parquet(idx))

    q = (spark.readStream.schema("doc_id long, text string")
         .option("maxFilesPerTrigger", "1").parquet(src)
         .writeStream.foreachBatch(ingest)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = {r.keep_id for r in spark.read.parquet(idx).collect()}
    # batch1 survivors: 1 (alpha), 2 (beta); batch2 adds only the genuinely
    # new texts: 11 (gamma), 13 (delta) — alpha/beta copies dropped by the
    # index, and doc 3's in-batch alpha copy collapsed into doc 1
    assert final == {1, 2, 11, 13}
    digests = {r.text_md5 for r in spark.read.parquet(idx).collect()}
    assert len(digests) == 4  # one digest per distinct text, no dupes


def test_transform_with_state_gate_raises_clearly(spark):
    """transformWithStateInPandas needs protobuf (absent here): the gate
    must raise the documented NotImplementedError up front, not let Spark
    crash the driver worker mid-query. If protobuf IS present, the full
    pipeline must match the batch aggregate."""
    import pytest
    from pyspark.sql import functions as F

    from datafusion_delta_sharing_spark.streaming import tws

    try:
        from google.protobuf import descriptor  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False

    if not have_protobuf:
        with pytest.raises(NotImplementedError, match="protobuf"):
            tws.tws_user_totals(spark, "/root/testdata/sf0.001")
        return

    got = tws.tws_user_totals(spark, "/root/testdata/sf0.001")
    events = spark.read.option("pathGlobFilter", "events.parquet").parquet(
        "/root/testdata/sf0.001")
    want = (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round(F.col("value") * 100).cast("bigint"))
                 .alias("total_cents")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
