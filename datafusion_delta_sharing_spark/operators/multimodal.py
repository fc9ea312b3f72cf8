"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio/video codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises ``NotImplementedError``; the
harness uses the deterministic fake) — but every Spark-side piece is real
and tested: the schema convention (binary payload + metadata struct), the
``mapInPandas`` batch shape, Arrow transfer, and partition-preserving
feature extraction. Swapping the fake for Pillow/ffmpeg is a one-function
change on executors.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = (
    "media_id bigint, byte_len bigint, digest string, "
    "mime string, feat_mean double, feat_dim int"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str,
                          source_col: str) -> DataFrame:
    """Demonstration builder: pack a text column as a utf-8 binary payload
    with a metadata struct — the schema convention real media rows follow."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — unavailable in this container (no Pillow/cv2).

    STUB: raises. Executor-side replacement point for a real pipeline."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "environment; use fake_features (deterministic) for plumbing tests"
    )


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a feature extractor: md5-seeded bytes
    scaled to [0, 1). Stable across processes — safe for oracle-less checks."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over media rows: batches arrive as
    Arrow-backed pandas frames, features computed per payload, partitioning
    untouched (no shuffle). This is the real 100 TB shape — only the inner
    ``fake_features`` call is a stand-in for a codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(lambda p: fake_features(p, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "byte_len": pdf["payload"].map(
                    lambda p: 0 if p is None else len(p)).astype("int64"),
                "digest": pdf["payload"].map(
                    lambda p: "" if p is None else hashlib.md5(p).hexdigest()),
                "mime": pdf["meta"].map(
                    lambda m: None if m is None else m["mime"]),
                "feat_mean": feats.map(
                    lambda v: round(sum(v) / len(v), 6)).astype("float64"),
                "feat_dim": dim,
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)
