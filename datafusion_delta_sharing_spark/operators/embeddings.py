"""Embedding-column transforms: L2 normalization and int8 quantization.

Pure JVM higher-order-function plans over ``array<float>`` columns — no
Python, no shuffle, linear scans that codegen end-to-end. For the
correctness harness, array results are reduced to exact integer digests
(md5 over fixed-point element strings) because float-array formatting is
not portable across engines but integers are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from datafusion_delta_sharing_spark.functions.vector import (
    l2_norm,  # noqa: F401 (re-export; single definition — a drifting
)             # duplicate here would silently diverge from cosine's norm)

_FIXED_POINT = 1_000_000  # 1e-6 resolution for cross-engine digests


def _as_double(x: Column) -> Column:
    return x.cast("double")


def l2_normalize_digest(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, dim, norm, digest) where digest is md5 over the normalized
    vector's elements scaled to 1e-6 fixed point — an exact, portable
    check of every element without shipping float arrays around."""
    v = F.col(vec_col)
    norm = l2_norm(v)
    unit = F.transform(v, lambda x: _as_double(x) / F.col("__norm"))
    # explicit zero-norm branch: an all-zero vector has no direction —
    # digest NULL on BOTH engines (without it, ANSI Spark raises
    # DIVIDE_BY_ZERO mid-job while DuckDB silently yields md5(''))
    digest = F.when(F.col("__norm") == 0, F.lit(None).cast("string")) \
        .otherwise(
            F.md5(F.array_join(
                F.transform(unit, lambda x: F.round(x * _FIXED_POINT)
                            .cast("bigint").cast("string")), ",")))
    return (
        emb.select(F.col(id_col), v.alias(vec_col), norm.alias("__norm"))
        .select(
            F.col(id_col),
            F.size(vec_col).cast("bigint").alias("dim"),
            F.round("__norm", 6).alias("norm"),
            digest.alias("digest"))
    )


def l2_normalize_digest_sql(source_sql: str, vec_col: str, id_col: str) -> str:
    """DuckDB mirror of :func:`l2_normalize_digest` (norm spelling shared
    with cosine via functions/vector.l2_norm_sql)."""
    from datafusion_delta_sharing_spark.functions.vector import l2_norm_sql
    return f"""
        SELECT {id_col}, CAST(len({vec_col}) AS BIGINT) AS dim,
               round(nrm, 6) AS norm,
               CASE WHEN nrm = 0 THEN NULL
                    ELSE md5(array_to_string(list_transform({vec_col},
                   x -> CAST(CAST(round(CAST(x AS DOUBLE) / nrm * {_FIXED_POINT})
                                  AS BIGINT) AS VARCHAR)), ','))
               END AS digest
        FROM (SELECT {id_col}, {vec_col}, {l2_norm_sql(vec_col)} AS nrm
              FROM {source_sql})
    """


def quantize_int8(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Symmetric int8 quantization: scale = max|x| / 127, q = round(x/scale).
    Emits (id, scale, qmin, qmax, qsum, qdigest); qdigest is md5 over the
    quantized elements, so any mis-wired element fails the oracle check."""
    v = F.col(vec_col)
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(_as_double(x))))
    # zero-scale branch (all-zero vector): q is NULL, so every derived
    # aggregate is NULL on both engines instead of an ANSI
    # DIVIDE_BY_ZERO abort on Spark only
    q = F.when(F.col("__scale") == 0,
               F.lit(None).cast("array<bigint>")) \
        .otherwise(F.transform(
            v, lambda x: F.round(_as_double(x) / F.col("__scale"))
            .cast("bigint")))
    return (
        emb.select(F.col(id_col), v.alias(vec_col),
                   (maxabs / 127.0).alias("__scale"))
        .select(F.col(id_col), F.col("__scale"), q.alias("__q"))
        .select(
            F.col(id_col),
            F.round("__scale", 6).alias("scale"),
            F.array_min("__q").alias("qmin"),
            F.array_max("__q").alias("qmax"),
            F.aggregate("__q", F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x).alias("qsum"),
            F.md5(F.array_join(F.transform("__q", lambda x: x.cast("string")),
                               ",")).alias("qdigest"))
    )


def quantize_int8_sql(source_sql: str, vec_col: str, id_col: str) -> str:
    """DuckDB mirror of :func:`quantize_int8`."""
    maxabs = f"list_max(list_transform({vec_col}, x -> abs(CAST(x AS DOUBLE))))"
    return f"""
        SELECT {id_col}, round(scl, 6) AS scale,
               list_min(q) AS qmin, list_max(q) AS qmax,
               CAST(list_sum(q) AS BIGINT) AS qsum,
               md5(array_to_string(list_transform(q,
                   x -> CAST(x AS VARCHAR)), ',')) AS qdigest
        FROM (
            SELECT {id_col},
                   CASE WHEN scl = 0 THEN NULL
                        ELSE list_transform({vec_col},
                       x -> CAST(round(CAST(x AS DOUBLE) / scl) AS BIGINT))
                   END AS q,
                   scl
            FROM (SELECT {id_col}, {vec_col}, {maxabs} / 127.0 AS scl
                  FROM {source_sql})
        )
    """
