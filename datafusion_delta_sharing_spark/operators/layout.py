"""Data-layout optimization: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB the scan cost of a selective query is set by how many files the
min/max stats let you skip. A layout sorted on one column gives tight
stats on that column only; interleaving the bits of two columns (Morton
code) and range-partitioning on the code bounds BOTH columns' per-file
spans to ~sqrt(domain) — so predicates on either column (or both) prune.
The reference engine reads file stats for pruning (src/datasource
/schema.rs stats parsing); this operator is the write-side counterpart
that makes those stats selective.

Everything is JVM-side bit arithmetic (shiftright/shiftleft/bitwiseAND)
inside whole-stage codegen — no UDFs — and the SQL mirror emits the same
explicit bit-interleave expression, so the harness check is hash-exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F


def morton_code(x: Column | str, y: Column | str, bits: int = 12) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: x takes
    the even bit positions, y the odd. Disjoint bit positions mean the OR
    is a plain sum — kept as `+` so the SQL mirror is byte-identical in
    semantics on engines without bitwise OR precedence quirks.

    Inputs are cast to bigint before shifting: on a 32-bit int column,
    ``shiftleft`` at position 31 (bits >= 16) wraps to negative int32 in
    Spark while DuckDB promotes — the cast keeps the shift 64-bit on both
    engines. ``bits`` is capped at 31 so the top interleaved position
    (2*bits - 1 = 61) stays inside a signed 64-bit code."""
    if not (1 <= bits <= 31):
        raise ValueError(
            f"morton_code: bits must be in [1, 31], got {bits} — position "
            "2*bits-1 must fit a signed 64-bit Morton code")
    x, y = F.col(x) if isinstance(x, str) else x, (
        F.col(y) if isinstance(y, str) else y)
    x, y = x.cast("bigint"), y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    return reduce(lambda a, b: a + b, terms)


def morton_code_sql(x: str, y: str, bits: int = 12) -> str:
    """DuckDB/ANSI mirror of morton_code (same explicit bit interleave,
    same bigint promotion so shift positions >= 31 agree)."""
    if not (1 <= bits <= 31):
        raise ValueError(
            f"morton_code_sql: bits must be in [1, 31], got {bits}")
    xb, yb = f"CAST({x} AS BIGINT)", f"CAST({y} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_bucket_stats(df: DataFrame, x_col: str, y_col: str, id_col: str,
                        n_buckets: int = 16, bits: int = 12) -> DataFrame:
    """Assign each row to one of ``n_buckets`` contiguous Z-order ranges
    (what repartitionByRange on the code does physically, expressed as
    ntile so the oracle can replay it) and report per-bucket min/max of
    both dimensions — i.e. exactly the file-skipping stats a reader would
    prune with. Tight spans on *both* columns are the proof the layout
    works; see tests for the span-vs-linear-sort comparison."""
    z = morton_code(x_col, y_col, bits).alias("zcode")
    w = Window.orderBy("zcode", "id")
    return (df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"),
                      F.col(id_col).alias("id"), z)
            .withColumn("bucket", F.ntile(n_buckets).over(w))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                 F.min("y").alias("y_min"), F.max("y").alias("y_max"))
            )


def zorder_bucket_stats_sql(source_sql: str, x_col: str, y_col: str,
                            id_col: str, n_buckets: int = 16,
                            bits: int = 12) -> str:
    """DuckDB mirror of zorder_bucket_stats."""
    zexpr = morton_code_sql(x_col, y_col, bits)
    return f"""
    WITH coded AS (
        SELECT {x_col} AS x, {y_col} AS y, {id_col} AS id,
               {zexpr} AS zcode
        FROM {source_sql}
    ), bucketed AS (
        SELECT x, y,
               ntile({n_buckets}) OVER (ORDER BY zcode, id) AS bucket
        FROM coded
    )
    SELECT bucket, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM bucketed GROUP BY bucket
    """


def write_zordered(df: DataFrame, path: str, x_col: str, y_col: str,
                   n_files: int, bits: int = 12,
                   mode: str = "overwrite") -> None:
    """Physically lay out parquet in Z-order: range-partition on the Morton
    code (one contiguous code range per output file — a real shuffle, but
    the only one, and range partitioning samples the code distribution so
    files are balanced even when the dimensions are skewed), sort within
    each file so row-group stats are tight too."""
    coded = df.withColumn("_zcode", morton_code(x_col, y_col, bits))
    (coded.repartitionByRange(n_files, "_zcode")
     .sortWithinPartitions("_zcode")
     .drop("_zcode")
     .write.mode(mode).parquet(path))


# -- small-file compaction planning --------------------------------------------

def compaction_bins(files: DataFrame, part_col: str, id_col: str,
                    size_col: str, target_bytes: int) -> DataFrame:
    """Greedy sequential bin-packing of a file inventory into compaction
    groups of ~``target_bytes`` — the planning half of the small-file
    problem (OPTIMIZE/compact in lakehouse engines; the reference's
    protocol serves whatever file layout exists, src/datasource/scan.rs,
    so layout hygiene lives with the writer).

    Semantics: within each partition, files in ``id_col`` order are
    assigned ``bin = floor(bytes_before / target)`` where bytes_before is
    the running size EXCLUDING the current file — the streaming
    formulation (each bin fills to >= target, overshooting by at most one
    file; a single window pass, no driver loop). Files larger than
    target occupy their bins alone, exactly as a real compactor leaves
    already-large files in place.

    One shuffle on ``part_col``; window state is O(1) per row. Output:
    (part, bin_id, n_files, total_bytes, first_id, last_id).
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(part_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    assigned = files.withColumn(
        "__bin",
        F.floor((F.sum(size_col).over(w) - F.col(size_col))
                / F.lit(target_bytes)).cast("bigint"))
    return (assigned.groupBy(F.col(part_col).alias("part"),
                             F.col("__bin").alias("bin_id"))
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(size_col).alias("total_bytes"),
                 F.min(id_col).alias("first_id"),
                 F.max(id_col).alias("last_id")))


def compaction_bins_sql(files_sql: str, part_col: str, id_col: str,
                        size_col: str, target_bytes: int) -> str:
    """DuckDB mirror of :func:`compaction_bins`."""
    return f"""
        SELECT {part_col} AS part, bin AS bin_id,
               count(*) AS n_files,
               CAST(sum({size_col}) AS BIGINT) AS total_bytes,
               min({id_col}) AS first_id, max({id_col}) AS last_id
        FROM (
            SELECT *,
                   CAST(floor((sum({size_col}) OVER (
                            PARTITION BY {part_col} ORDER BY {id_col}
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)
                        - {size_col}) / {target_bytes}) AS BIGINT) AS bin
            FROM ({files_sql})
        )
        GROUP BY 1, 2
    """
