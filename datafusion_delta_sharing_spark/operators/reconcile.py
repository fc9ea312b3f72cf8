"""Table reconciliation by bucket digest — find WHERE two 100 TB
snapshots differ without comparing rows.

The pattern (anti-entropy repair in Dynamo-style systems; here flattened
to one level because SQL engines prefer one wide aggregate over a
Merkle recursion): every row renders a canonical string, hashes to a
60-bit integer, and lands in one of B buckets by key hash. Each side
then reduces to B (bucket, n_rows, xor-digest) rows — XOR is
commutative/associative/self-inverse, so the digest is order- and
partition-independent and insert+delete of the same row cancels. A full
outer join of the two B-row summaries names exactly the buckets holding
any insert/update/delete; only those buckets ever need row-level
comparison. Wire cost: 2 full scans + 2·B summary rows, never a row
shuffle.

Determinism contract: callers render floats/decimals to exact integer
text (cents) inside ``row_repr`` — double-to-string is NOT
cross-engine-stable, integers and dates are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DIGEST_HEX = 15  # 60-bit row digests: conv()/CAST stay inside int64
_BUCKET_HEX = 2   # 256 buckets


def row_digest(row_repr: F.Column) -> F.Column:
    """60-bit integer digest of a canonical row rendering."""
    return F.conv(F.substring(F.md5(row_repr), 1, _DIGEST_HEX),
                  16, 10).cast("bigint")


def row_digest_sql(row_repr_sql: str) -> str:
    return (f"CAST(CAST('0x' || substr(md5({row_repr_sql}), 1, "
            f"{_DIGEST_HEX}) AS BIGINT) AS BIGINT)")


def bucket_of(key: F.Column) -> F.Column:
    """Bucket label: first 2 hex chars of the KEY hash (the key, not the
    row — an UPDATE must keep the row in the same bucket so it shows as
    one differing bucket, not two)."""
    return F.substring(F.md5(key.cast("string")), 1, _BUCKET_HEX)


def bucket_of_sql(key_sql: str) -> str:
    return f"substr(md5(CAST({key_sql} AS VARCHAR)), 1, {_BUCKET_HEX})"


def snapshot_summary(df: DataFrame, key: F.Column,
                     row_repr: F.Column) -> DataFrame:
    """(bucket, n_rows, digest): one hash aggregate to B rows."""
    return (df.select(bucket_of(key).alias("bucket"),
                      row_digest(row_repr).alias("__d"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(__d)").alias("digest")))


def snapshot_summary_sql(source_sql: str, key_sql: str,
                         row_repr_sql: str) -> str:
    return f"""
        SELECT {bucket_of_sql(key_sql)} AS bucket,
               count(*) AS n_rows,
               bit_xor({row_digest_sql(row_repr_sql)}) AS digest
        FROM {source_sql} GROUP BY 1
    """


def table_diff_digest(a: DataFrame, b: DataFrame, key: str,
                      row_repr: F.Column) -> DataFrame:
    """Differing buckets between snapshots ``a`` and ``b`` (same schema):
    (bucket, n_a, n_b) for every bucket whose count OR digest differs —
    absent-on-one-side buckets included (counts coalesce to 0). Equal
    snapshots return zero rows."""
    sa = snapshot_summary(a, F.col(key), row_repr)
    sb = snapshot_summary(b, F.col(key), row_repr)
    j = (sa.withColumnRenamed("n_rows", "n_a")
         .withColumnRenamed("digest", "d_a")
         .join(sb.withColumnRenamed("n_rows", "n_b")
               .withColumnRenamed("digest", "d_b"),
               "bucket", "full_outer"))
    return (j.filter(~(F.col("d_a").eqNullSafe(F.col("d_b"))
                       & F.col("n_a").eqNullSafe(F.col("n_b"))))
            .select("bucket",
                    F.coalesce("n_a", F.lit(0)).alias("n_a"),
                    F.coalesce("n_b", F.lit(0)).alias("n_b")))


def table_diff_digest_sql(a_sql: str, b_sql: str, key_sql: str,
                          row_repr_sql: str) -> str:
    """DuckDB mirror of :func:`table_diff_digest`."""
    return f"""
        SELECT coalesce(sa.bucket, sb.bucket) AS bucket,
               coalesce(sa.n_rows, 0) AS n_a,
               coalesce(sb.n_rows, 0) AS n_b
        FROM ({snapshot_summary_sql(a_sql, key_sql, row_repr_sql)}) sa
        FULL OUTER JOIN
             ({snapshot_summary_sql(b_sql, key_sql, row_repr_sql)}) sb
          ON sa.bucket = sb.bucket
        WHERE NOT (sa.digest IS NOT DISTINCT FROM sb.digest
                   AND sa.n_rows IS NOT DISTINCT FROM sb.n_rows)
    """
