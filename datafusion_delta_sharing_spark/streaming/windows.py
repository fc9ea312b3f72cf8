"""Structured Streaming operators (SURVEY.md §2 Tier B streaming row).

The reference's only streaming-adjacent surface is the unimplemented CDF
stub (src/client/mod.rs:384-386). We go further: real Structured Streaming
over the events table — file source, event-time windowed aggregation,
watermark, memory sink — driven to completion synchronously so batch
oracles can check the result.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # nanos (read with nanosAsLong)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts by type, computed by an actual streaming query:
    readStream(parquet) -> watermark -> window(1 hour) -> complete-mode
    memory sink, run to completion with processAllAvailable."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource wants a directory: stream the testdata dir with a
    # glob filter selecting only the events file
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks require TIMESTAMP (ltz); session tz pinned UTC above, and
    # the output window start is cast back to NTZ so a non-UTC driver
    # session cannot shift the collected values
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").cast("timestamp_ntz").alias("window_start"),
                "event_type", "n")
    )
    sink = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    query = (agg.writeStream.outputMode("complete")
             .format("memory").queryName(sink).start())
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    # materialize before the in-memory sink table goes away
    result = spark.table(sink)
    out = spark.createDataFrame(result.collect(), result.schema)
    return out
