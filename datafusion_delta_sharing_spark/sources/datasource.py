"""Spark Python DataSource for Delta Sharing (Spark 4 ``pyspark.sql.datasource``).

The closest Spark-native analogue of the reference's DataFusion
``TableProvider`` (``/root/reference/src/datasource/table.rs``): Spark calls
``schema()`` (metadata fetch), ``pushFilters`` (A5: filters -> JSON predicate
hints, ALL filters returned unhandled so Spark keeps the residual — the
reference's ``Inexact`` verdict, table.rs:198-213), ``partitions()`` (file
listing with server + stats pruning; one partition per file, A1) and
``read()`` on executors (ranged-HTTP parquet -> Arrow batches + typed
partition columns, A2/A3/A20).

Usage::

    spark.dataSource.register(DeltaSharingDataSource)
    df = (spark.read.format("deltasharing")
          .option("profile", "/path/profile.share")   # or profile_json
          .option("table", "share.schema.table")
          .load())

    stream = (spark.readStream.format("deltasharing")
              .option("profile", ...).option("table", ...)
              .load())   # snapshot-diff microbatches: new files per poll

The streaming reader is the engine's answer to the reference's CDF stub
(A34, ``todo!()`` at src/client/mod.rs:384-386): for append-only shared
tables, each microbatch emits rows from files not seen at the previous
offset (offset = sorted file-id list + table version).
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

from datafusion_delta_sharing_spark.errors import DeltaSharingError, PredicateError
from datafusion_delta_sharing_spark.plans.predicates import Op, ValueType, conjunction
from datafusion_delta_sharing_spark.plans.pruning import may_match
from datafusion_delta_sharing_spark.securable import Table


def _make_client(options) -> tuple:
    from datafusion_delta_sharing_spark.client import DeltaSharingClient
    from datafusion_delta_sharing_spark.profile import Profile

    if options.get("profile_json"):
        profile = Profile.from_json(options["profile_json"])
    elif options.get("profile"):
        profile = Profile.from_path(options["profile"])
    else:
        raise DeltaSharingError(
            "deltasharing source needs .option('profile', path) or "
            ".option('profile_json', json)")
    fqn = options.get("table")
    if not fqn:
        raise DeltaSharingError(
            "deltasharing source needs .option('table', 'share.schema.table')")
    return DeltaSharingClient(profile), Table.from_str(fqn)


class _FilePartition(InputPartition):
    def __init__(self, url: str, size: int, file_id: str,
                 partition_values: dict[str, str]):
        self.url = url
        self.size = size
        self.file_id = file_id
        self.partition_values = partition_values


def _filters_to_op(filters: Sequence[Filter], schema: T.StructType) -> Op | None:
    """Spark Filter objects -> json-predicate conjunction. Unconvertible
    filters are skipped (they are returned unhandled anyway — hints are
    best-effort)."""
    types: dict[str, ValueType] = {}
    for field in schema.fields:
        try:
            types[field.name] = ValueType.from_spark_type(field.dataType)
        except PredicateError:
            continue

    ops = []
    for f in filters:
        op = _one_filter(f, types)
        if op is not None:
            ops.append(op)
    return conjunction(ops)


def _one_filter(f: Filter, types: dict[str, ValueType]) -> Op | None:
    binary = {
        EqualTo: Op.equal,
        LessThan: Op.less_than,
        LessThanOrEqual: Op.less_than_or_equal,
        GreaterThan: Op.greater_than,
        GreaterThanOrEqual: Op.greater_than_or_equal,
    }
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1 or attr[0] not in types:
        return None
    name = attr[0]
    vt = types[name]
    for cls, builder in binary.items():
        if isinstance(f, cls):
            return builder(Op.column(name, vt), Op.literal(f.value, vt))
    if isinstance(f, IsNull):
        return Op.is_null(Op.column(name, vt))
    if isinstance(f, IsNotNull):
        return Op.is_not_null(Op.column(name, vt))
    return None


class DeltaSharingBatchReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.options = options
        self.full_schema = schema
        self.hints_op: Op | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Convert what we can into jsonPredicateHints; yield back EVERY
        filter so Spark re-applies them all (inexact semantics, A5)."""
        self.hints_op = _filters_to_op(filters, self.full_schema)
        yield from filters

    def partitions(self) -> list[_FilePartition]:
        client, table = _make_client(self.options)
        hints = self.hints_op.to_json() if self.hints_op is not None else None
        data = client.get_table_data(table, json_predicate_hints=hints)
        self.partition_columns = list(data.metadata.partition_columns)
        files = list(data.files)
        if self.hints_op is not None:
            files = [f for f in files if may_match(self.hints_op, f.parsed_stats())]
        if not files:
            # Spark requires >= 1 partition; empty sentinel yields no batches
            return [_FilePartition("", 0, "", {})]
        return [_FilePartition(f.url, f.size, f.id, dict(f.partition_values))
                for f in files]

    def read(self, partition: _FilePartition):
        if not partition.url:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq

        from datafusion_delta_sharing_spark.sources.reader import (
            _open_parquet_source,
            _spark_struct_to_arrow_schema,
        )
        from datafusion_delta_sharing_spark.sources.schema import (
            decode_partition_values,
        )

        raw_pcols = self.options.get("partition_columns")
        pcol_set = (set(json.loads(raw_pcols)) if raw_pcols
                    else set(partition.partition_values))
        partition_columns = [f.name for f in self.full_schema.fields
                             if f.name in pcol_set]
        data_cols = [f.name for f in self.full_schema.fields
                     if f.name not in partition_columns]
        arrow_schema = _spark_struct_to_arrow_schema(self.full_schema)
        decoded = decode_partition_values(
            partition.partition_values, self.full_schema, partition_columns)

        reader = pq.ParquetFile(_open_parquet_source(partition.url, partition.size))
        for batch in reader.iter_batches(columns=data_cols or None):
            n = batch.num_rows
            arrays = []
            for field in self.full_schema.fields:
                atype = arrow_schema.field(field.name).type
                if field.name in partition_columns:
                    arrays.append(pa.nulls(n, atype) if decoded[field.name] is None
                                  else pa.array([decoded[field.name]] * n, type=atype))
                else:
                    col = batch.column(batch.schema.get_field_index(field.name))
                    arrays.append(col.cast(atype))
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


class DeltaSharingStreamReader(SimpleDataSourceStreamReader):
    """Snapshot-diff microbatch source: offset = {version, file ids seen};
    each poll emits rows from files not in the previous offset."""

    def __init__(self, options, schema: T.StructType):
        self.options = options
        self.full_schema = schema

    def initialOffset(self) -> dict:
        return {"version": -1, "ids": []}

    def read(self, start: dict):
        client, table = _make_client(self.options)
        data = client.get_table_data(table)
        seen = set(start.get("ids", []))
        new_files = [f for f in data.files if f.id not in seen]
        end = {"version": data.version if data.version is not None else -1,
               "ids": sorted(seen | {f.id for f in data.files})}
        rows = self._rows_for(new_files, list(data.metadata.partition_columns))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        client, table = _make_client(self.options)
        data = client.get_table_data(table)
        wanted = set(end.get("ids", [])) - set(start.get("ids", []))
        files = [f for f in data.files if f.id in wanted]
        missing = wanted - {f.id for f in files}
        if missing:
            # replay after failure must reproduce the original batch exactly;
            # files dropped from the listing (vacuum / retention expiry) make
            # that impossible — fail loudly instead of returning fewer rows
            raise DeltaSharingError(
                f"cannot replay microbatch for {table.full_name()}: "
                f"{len(missing)} committed file(s) no longer listed "
                f"(expired or vacuumed): {sorted(missing)[:5]}")
        return iter(self._rows_for(files, list(data.metadata.partition_columns)))

    def _rows_for(self, files, partition_columns):
        import pyarrow.parquet as pq

        from datafusion_delta_sharing_spark.sources.reader import _open_parquet_source
        from datafusion_delta_sharing_spark.sources.schema import (
            decode_partition_values,
        )

        field_names = [f.name for f in self.full_schema.fields]
        data_cols = [n for n in field_names if n not in partition_columns]
        out = []
        for f in files:
            decoded = decode_partition_values(
                f.partition_values, self.full_schema, partition_columns)
            table = pq.ParquetFile(
                _open_parquet_source(f.url, f.size)).read(columns=data_cols or None)
            for row in table.to_pylist():
                out.append(tuple(
                    decoded[n] if n in partition_columns else row[n]
                    for n in field_names))
        return out


class DeltaSharingDataSource(DataSource):
    """``spark.read.format("deltasharing")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "deltasharing"

    def schema(self) -> T.StructType:
        from datafusion_delta_sharing_spark.sources.schema import schema_from_string

        client, table = _make_client(self.options)
        _, metadata = client.get_table_metadata(table)
        # remember partition columns for the readers (options travel)
        self.options["partition_columns"] = json.dumps(
            list(metadata.partition_columns))
        return schema_from_string(metadata.schema_string)

    def reader(self, schema: T.StructType) -> DeltaSharingBatchReader:
        return DeltaSharingBatchReader(self.options, schema)

    def simpleStreamReader(self, schema: T.StructType) -> DeltaSharingStreamReader:
        return DeltaSharingStreamReader(self.options, schema)
