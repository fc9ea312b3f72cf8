"""Time-series rollup operators (hypertable-style continuous aggregates).

Downsampling an event stream into fixed buckets with open/high/low/close
semantics is the canonical time-series materialization. The scalable form
is a single groupBy on (entity, bucket): open/close are min_by/max_by on a
unique (ts, id) ordering struct — deterministic even when two events share
a timestamp — so the whole rollup is one shuffle with map-side partial
aggregation, never a window over the full series.

Both engines order open/close by the same zero-padded "<epoch_us>-<id>"
string (lexicographic == numeric for fixed-width non-negative numbers):
DuckDB's arg_min/arg_max only take scalar ordering keys, and the shared
rendering guarantees the two engines break ts ties identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ohlc_rollup(df: DataFrame, ts_col: str, key_col: str, val_col: str,
                id_col: str, bucket_minutes: int = 60) -> DataFrame:
    """(key, bucket_start, n, open, high, low, close, total) per entity and
    time bucket. One hash aggregate; open/close deterministic via the
    unique (ts, id) ordering."""
    secs = bucket_minutes * 60
    # integer-µs floor division on both engines: float seconds would round
    # vs truncate differently at bucket edges
    bucket = F.timestamp_seconds(
        F.expr(f"unix_micros(cast({ts_col} as timestamp))"
               f" div {secs * 1_000_000}") * secs)
    order = F.format_string(
        "%020d-%012d", F.unix_micros(F.col(ts_col).cast("timestamp")),
        F.col(id_col))
    return (df.groupBy(F.col(key_col).alias("key"),
                       bucket.cast("timestamp_ntz").alias("bucket_start"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min_by(val_col, order), 2).alias("open"),
                 F.round(F.max(val_col), 2).alias("high"),
                 F.round(F.min(val_col), 2).alias("low"),
                 F.round(F.max_by(val_col, order), 2).alias("close"),
                 F.round(F.sum(val_col), 2).alias("total")))


def ohlc_rollup_sql(source_sql: str, ts_col: str, key_col: str,
                    val_col: str, id_col: str,
                    bucket_minutes: int = 60) -> str:
    """DuckDB mirror of ohlc_rollup."""
    secs = bucket_minutes * 60
    bucket = (f"to_timestamp((epoch_us({ts_col}) // {secs * 1_000_000})"
              f" * {secs})::TIMESTAMP")
    order = f"printf('%020d-%012d', epoch_us({ts_col}), {id_col})"
    return f"""
    SELECT {key_col} AS key,
           {bucket} AS bucket_start,
           CAST(count(*) AS BIGINT) AS n,
           round(arg_min({val_col}, {order}), 2) AS open,
           round(max({val_col}), 2) AS high,
           round(min({val_col}), 2) AS low,
           round(arg_max({val_col}, {order}), 2) AS close,
           round(sum({val_col}), 2) AS total
    FROM {source_sql}
    GROUP BY 1, 2
    """
