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
offset. It is a partition-planning ``DataSourceStreamReader`` (VERDICT r2
#5): rows are read in *executor* tasks (one per new file, Arrow batches),
never on the driver, and the offset is O(1) — ``{"version", "batch"}`` —
regardless of how many files the table has accumulated. The per-batch file
manifest lives in an append-only JSONL commit log on the driver
(``stream_log_dir`` option; a fresh temp dir by default) so a replayed
microbatch reproduces its original file set exactly.
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringStartsWith,
)

from datafusion_delta_sharing_spark.errors import DeltaSharingError, PredicateError
from datafusion_delta_sharing_spark.plans.predicates import Op, ValueType, conjunction
from datafusion_delta_sharing_spark.plans.pruning import may_match
from datafusion_delta_sharing_spark.securable import Table
from datafusion_delta_sharing_spark.sources.dv import (
    validate_descriptor as validate_dv_descriptor,
)


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
                 partition_values: dict[str, str],
                 deletion_vector: dict | None = None,
                 column_mapped: bool = False):
        self.url = url
        self.size = size
        self.file_id = file_id
        # keys are LOGICAL names (partitions() normalizes column-mapped
        # tables' physical keys before planning)
        self.partition_values = partition_values
        self.deletion_vector = deletion_vector
        # True when delta.columnMapping.mode is name/id: the executor
        # read resolves parquet columns via the schema's physicalName
        # metadata instead of the logical field names
        self.column_mapped = column_mapped


class _CDFFilePartition(_FilePartition):
    def __init__(self, url: str, size: int, file_id: str,
                 partition_values: dict[str, str], kind: str,
                 version: int, timestamp: int,
                 deletion_vector: dict | None = None):
        super().__init__(url, size, file_id, partition_values,
                         deletion_vector)
        self.kind = kind          # add | remove | cdf
        self.version = version
        self.timestamp = timestamp  # ms epoch


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
    if isinstance(f, Not):
        # the wire format has a first-class "not"; sound for hints (the
        # server prunes to a superset) and for local pruning (may_match
        # only analyzes not(isNull), everything else keeps the file)
        inner = _one_filter(f.child, types)
        return Op.not_(inner) if inner is not None else None
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1 or attr[0] not in types:
        return None
    name = attr[0]
    vt = types[name]
    for cls, builder in binary.items():
        if isinstance(f, cls):
            return builder(Op.column(name, vt), Op.literal(f.value, vt))
    if isinstance(f, In):
        # IN -> or(equal, ...): the wire format has no IN op. A NULL in
        # the list renders nothing useful — skip the whole filter (it is
        # re-applied exactly by Spark anyway; hints are best-effort)
        values = [v for v in f.value if v is not None]
        if not values or len(values) != len(f.value):
            return None
        col = Op.column(name, vt)
        eqs = [Op.equal(col, Op.literal(v, vt)) for v in values]
        return eqs[0] if len(eqs) == 1 else Op.or_(eqs)
    if isinstance(f, EqualNullSafe):
        # col <=> NULL is exactly isNull; with a non-null literal the
        # matching rows are a subset of equal's (equal never matches
        # NULL either), so equal is the precise hint
        col = Op.column(name, vt)
        if f.value is None:
            return Op.is_null(col)
        return Op.equal(col, Op.literal(f.value, vt))
    if isinstance(f, StringStartsWith) and vt == ValueType.STRING:
        # startswith(prefix) -> prefix <= col < bumped-prefix: every
        # matching string falls in the range, so the hint is a sound
        # superset. Only for printable-ASCII prefixes, where Python's
        # codepoint order, UTF-8 byte order, and any reasonable server
        # collation agree; anything else stays residual-only.
        prefix = f.value
        if prefix and all(" " <= ch < "\x7f" for ch in prefix):
            col = Op.column(name, vt)
            upper = prefix[:-1] + chr(ord(prefix[-1]) + 1)
            return Op.and_([
                Op.greater_than_or_equal(col, Op.literal(prefix, vt)),
                Op.less_than(col, Op.literal(upper, vt))])
        return None
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
        version, timestamp = _snapshot_pins(self.options)
        data = client.get_table_data(table, json_predicate_hints=hints,
                                     version=version, timestamp=timestamp)
        _check_reader_features(data.protocol)
        from datafusion_delta_sharing_spark.sources.reader import (
            _has_variant,
        )

        if _has_variant(self.full_schema):
            # this source always decodes through pyarrow, which cannot
            # parse a parquet footer containing the VARIANT logical type
            raise DeltaSharingError(
                "table has VARIANT columns, which format('deltasharing') "
                "cannot decode (pyarrow footer parse); use "
                "DeltaSharingReader over a local (file://) share")
        if data.metadata.format_provider.lower() != "parquet":
            # refuse at PLAN time like the DeltaSharingReader path does
            # (r9 review): without this, every executor task fails deep
            # inside the parquet footer parse after downloading bytes
            raise DeltaSharingError(
                f"unsupported file format "
                f"{data.metadata.format_provider!r}; only parquet-backed "
                "shares are supported")
        mapping = _column_mapping_of(data.metadata, self.full_schema)
        # rename-swap guard (r9 review, mirrors the reader scan path):
        # when one column's logical name is another's physical name, a
        # spelling-agnostic stats lookup can read the WRONG column's
        # range and a get(k, k) key normalization can misroute a
        # partition value — disable stats pruning and refuse ambiguous
        # partition keys instead
        from datafusion_delta_sharing_spark.sources.schema import (
            ambiguous_mapping_names,
        )

        ambiguous = ambiguous_mapping_names(mapping) if mapping else set()
        files = list(data.files)
        if ambiguous:
            clash = sorted({k for f in files if f.partition_values
                            for k in f.partition_values if k in ambiguous})
            if clash:
                raise DeltaSharingError(
                    "column-mapping renames make partition-value key(s) "
                    f"{clash} ambiguous (one column's logical name is "
                    "another's physical name); ask the provider for a "
                    "parquet-format share")
        if self.hints_op is not None and not ambiguous:
            # two exact stat sources per file — the server's stats JSON
            # and synthetic stats from the partition values (a server
            # that ignores jsonPredicateHints returns every partition).
            # Under column mapping, keys may be physical (raw delta-
            # format actions) or logical (parquet-format, server-
            # translated): prune under both spellings — the wrong one
            # finds no stats and cannot exclude, so the conjunction
            # stays sound (ambiguous rename-swap tables skip pruning;
            # Spark re-applies every filter, so results stay exact)
            from datafusion_delta_sharing_spark.plans.pruning import (
                partition_value_stats,
            )

            ops = [self.hints_op]
            if mapping:
                ops.append(self.hints_op.rename_columns(mapping))
            files = [f for f in files
                     if all(may_match(op, st) for op in ops
                            for st in (f.parsed_stats(),
                                       partition_value_stats(
                                           f.partition_values)))]
        if not files:
            # Spark requires >= 1 partition; empty sentinel yields no batches
            return [_FilePartition("", 0, "", {})]
        for f in files:
            if f.deletion_vector:  # refuse unresolvable DVs at plan time
                validate_dv_descriptor(f.deletion_vector, data_url=f.url)
        inverse = {v: k for k, v in (mapping or {}).items()}
        return [_FilePartition(f.url, f.size, f.id,
                               {inverse.get(k, k): v
                                for k, v in f.partition_values.items()},
                               deletion_vector=f.deletion_vector,
                               column_mapped=bool(mapping))
                for f in files]

    def read(self, partition: _FilePartition):
        if not partition.url:
            return iter(())
        return _read_file_partition(self.options, self.full_schema, partition)


def _partition_columns_of(options, full_schema: T.StructType,
                          partition: _FilePartition) -> list[str]:
    raw_pcols = options.get("partition_columns")
    pcol_set = (set(json.loads(raw_pcols)) if raw_pcols
                else set(partition.partition_values))
    return [f.name for f in full_schema.fields if f.name in pcol_set]


def _check_reader_features(protocol) -> None:
    """Refuse required delta reader features the scan layer cannot honor
    (same check as DeltaSharingReader._dataframe_from_listing — silently
    scanning e.g. a typeWidening table as plain parquet yields wrong
    rows)."""
    from datafusion_delta_sharing_spark.sources.reader import (
        _SUPPORTED_READER_FEATURES,
    )

    unsupported = [f for f in protocol.reader_features
                   if f.lower() not in _SUPPORTED_READER_FEATURES]
    if unsupported:
        raise DeltaSharingError(
            f"table requires reader features {sorted(unsupported)} "
            "this client does not implement; supported: "
            f"{sorted(_SUPPORTED_READER_FEATURES)}")


def _column_mapping_of(metadata, full_schema: T.StructType) -> dict | None:
    """One validated entry point shared with the reader paths — see
    sources/schema.column_mapping_of (r9 review unification)."""
    from datafusion_delta_sharing_spark.sources.schema import (
        column_mapping_of,
    )

    return column_mapping_of(metadata, full_schema)


def _read_file_partition(options, full_schema: T.StructType,
                         partition: _FilePartition, refresh=None):
    """Executor-side read of ONE shared file: ranged-HTTP (or file://)
    parquet -> Arrow batches cast to the share schema, typed partition
    values re-attached per batch (A2/A3/A20). Shared by the batch and
    streaming readers. If the recorded presigned URL has expired (streaming
    replay long after the manifest was logged), the file is re-resolved by
    id through a fresh listing — one REST round-trip, executor-local."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_delta_sharing_spark.sources.dv import (
        dv_identity_changed,
        dv_positions,
        positions_mask,
    )
    from datafusion_delta_sharing_spark.sources.reader import (
        _open_parquet_source,
        _spark_struct_to_arrow_schema,
    )
    from datafusion_delta_sharing_spark.sources.schema import (
        decode_partition_values,
    )

    partition_columns = _partition_columns_of(options, full_schema, partition)
    # column-mapped tables: the parquet columns are named by the schema's
    # physicalName metadata (available executor-side ON the schema, no
    # extra driver state); partition_values keys were normalized to
    # logical at planning time, so only the parquet read needs physical
    # spellings — output batches are logical either way
    phys: dict[str, str] = {}
    if getattr(partition, "column_mapped", False):
        from datafusion_delta_sharing_spark.sources.schema import (
            column_mapping,
        )

        phys = column_mapping(full_schema) or {}
    data_cols = [phys.get(f.name, f.name) for f in full_schema.fields
                 if f.name not in partition_columns]
    arrow_schema = _spark_struct_to_arrow_schema(full_schema)
    decoded = decode_partition_values(
        partition.partition_values, full_schema, partition_columns)
    dv = getattr(partition, "deletion_vector", None)
    if refresh is None:
        refresh = lambda: _refresh_file_action(options, partition.file_id)  # noqa: E731

    def dv_deleted(descriptor):
        """Decode the DV; on an expired presigned DV URL (401/403),
        re-resolve the file once and retry with the fresh descriptor —
        the same escape hatch the data URL gets below. The fresh DV must
        describe the SAME deletion set (a replayed microbatch must emit
        its original rows): if the table gained deletes since the batch
        was logged, silently using the new DV would change row content
        between original and replay — refuse loudly instead."""
        import requests

        try:
            return dv_positions(descriptor)
        except requests.HTTPError as exc:
            status = (exc.response.status_code
                      if exc.response is not None else None)
            if status not in (401, 403):
                raise
            fresh_dv = refresh().deletion_vector
            if dv_identity_changed(fresh_dv, descriptor):
                raise DeltaSharingError(
                    f"deletion vector of file {partition.file_id!r} "
                    "changed between the logged microbatch and its "
                    "replay; cannot reproduce the original rows "
                    f"(logged {descriptor!r}, current {fresh_dv!r})"
                ) from exc
            return dv_positions(fresh_dv)

    deleted = dv_deleted(dv) if dv else None

    def _open(url, size):
        import requests

        from datafusion_delta_sharing_spark.sources.reader import (
            _RangedHttpFile,
        )

        def _pf(u, s):
            src = _open_parquet_source(u, s)
            # pre_buffer coalesces projected column-chunk reads into
            # ranged batches — fewer round trips per file over HTTP
            # (see reader.py:_fetch_batches_task, same rationale)
            if isinstance(src, _RangedHttpFile):
                return pq.ParquetFile(src, pre_buffer=True)
            return pq.ParquetFile(src)

        try:
            return _pf(url, size)
        except requests.HTTPError as exc:
            # ONLY auth failures mean an expired presigned URL; anything
            # else (corrupt footer, 404, scheme errors) must surface as
            # itself, not be masked by a pointless re-listing
            status = (exc.response.status_code
                      if exc.response is not None else None)
            if status not in (401, 403):
                raise
            fresh = refresh()
            return _pf(fresh.url, fresh.size)

    reader = _open(partition.url, partition.size)
    file_row = 0  # physical row position within the file
    for batch in reader.iter_batches(columns=data_cols or None):
        if deleted is not None:
            mask = positions_mask(deleted, file_row, batch.num_rows)
            file_row += batch.num_rows
            if mask is not None:
                batch = batch.filter(pa.array(mask))
                if batch.num_rows == 0:
                    continue
        n = batch.num_rows
        arrays = []
        for field in full_schema.fields:
            atype = arrow_schema.field(field.name).type
            if field.name in partition_columns:
                arrays.append(pa.nulls(n, atype) if decoded[field.name] is None
                              else pa.array([decoded[field.name]] * n, type=atype))
            else:
                idx = batch.schema.get_field_index(
                    phys.get(field.name, field.name))
                if idx < 0:
                    # schema evolution: files written before a column was
                    # added lack it — Delta semantics is NULL. Indexing
                    # with the raw -1 would silently return the LAST
                    # column's data under this name (pyarrow negative
                    # indexing), which is data corruption, not an error
                    arrays.append(pa.nulls(n, atype))
                else:
                    arrays.append(batch.column(idx).cast(atype))
        yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def _check_schema_drift(reader, table, schema_string: str) -> None:
    """A share's table can be schema-evolved underneath a running stream;
    silently decoding new bytes with the old schema mis-reads or drops
    columns. Pin the first schema seen and fail LOUDLY on drift — the
    operator restarts the stream with the new schema deliberately."""
    seen = getattr(reader, "_schema_string_seen", None)
    if seen is None:
        reader._schema_string_seen = schema_string
    elif seen != schema_string:
        raise DeltaSharingError(
            f"schema of {table.full_name()} changed while the stream was "
            "running; restart the query to pick up the new schema "
            "(refusing to decode new files with the old one)")


def _snapshot_pins(options) -> tuple[int | None, str | None]:
    """``versionAsOf`` / ``timestampAsOf`` reader options -> query-body
    snapshot pins (protocol time travel; reproducible training reads)."""
    raw = options.get("versionAsOf")
    try:
        version = int(raw) if raw is not None else None
    except (TypeError, ValueError) as exc:
        raise DeltaSharingError(
            f"versionAsOf must be an integer version, got {raw!r}"
        ) from exc
    return version, options.get("timestampAsOf")


def _refresh_file_action(options, file_id: str):
    """Re-resolve a file by id via a fresh listing (expired-URL escape
    hatch); the re-list stays inside the same pinned snapshot, if any.
    Returns the fresh FileAction — URL, size AND deletion-vector
    descriptor, whose presigned DV URL can expire exactly like the data
    URL."""
    client, table = _make_client(options)
    version, timestamp = _snapshot_pins(options)
    data = client.get_table_data(table, version=version, timestamp=timestamp)
    for f in data.files:
        if f.id == file_id:
            return f
    raise DeltaSharingError(
        f"file {file_id!r} of {table.full_name()} is no longer listed "
        "(expired or vacuumed) — cannot replay this partition")


def _refresh_cdf_file_action(options, file_id: str, version: int):
    """Expired-URL escape hatch for CDF partitions: change-action files
    (remove/cdc) never appear in the snapshot listing `_refresh_file_action`
    consults, so a CDF replay must re-resolve through `/changes` for the
    partition's own commit version (r5 review — without this, routine URL
    expiry permanently wedged CDF streams on remove/cdc files)."""
    client, table = _make_client(options)
    changes = client.get_table_changes(
        table, starting_version=version, ending_version=version)
    for _, f in changes.actions:
        if f.id == file_id:
            return f
    raise DeltaSharingError(
        f"change file {file_id!r} of {table.full_name()} version "
        f"{version} is no longer served (vacuumed) — cannot replay "
        "this partition")


class DeltaSharingStreamReader(DataSourceStreamReader):
    """Snapshot-diff microbatch source with executor-side reads.

    Offset = ``{"version": V, "batch": N}`` — constant size however long the
    stream runs (VERDICT r2 #5; the r1 design's offset grew with the file
    count). The driver polls the share at ``latestOffset``; files not seen
    before become microbatch N+1, recorded as one JSONL line in the commit
    log. ``partitions(start, end)`` plans one :class:`_FilePartition` per
    manifest entry of batches ``start+1..end`` and Spark distributes the
    actual parquet fetch to executors (same ``_read_file_partition`` path as
    the batch source). Replay after a driver restart reloads the manifest
    from the log; a replay the log cannot satisfy fails loudly rather than
    silently emitting fewer rows."""

    def __init__(self, options, schema: T.StructType):
        import os
        import tempfile

        # snapshot pins contradict a snapshot-DIFF stream (r9 review):
        # latestOffset polls the LIVE table, so a versionAsOf would be
        # silently ignored for data while the expired-URL refresh path
        # honored it — replays of post-pin files would then fail with
        # 'no longer listed'. Refuse up front; pin a snapshot with the
        # batch reader instead.
        version, timestamp = _snapshot_pins(options)
        if version is not None or timestamp is not None:
            raise DeltaSharingError(
                "versionAsOf/timestampAsOf are not supported on the "
                "streaming source (a snapshot-diff stream follows the "
                "live table); use spark.read for a pinned snapshot")
        self.options = options
        self.full_schema = schema
        log_dir = options.get("stream_log_dir") or tempfile.mkdtemp(
            prefix="deltasharing-stream-")
        os.makedirs(log_dir, exist_ok=True)
        self._log_path = os.path.join(log_dir, "batches.jsonl")
        self._batches: dict[int, list[dict]] = {}
        self._latest_batch = -1
        self._seen: set[str] = set()
        self._version = -1
        self._load_log()
        # Spark may poll latestOffset() BEFORE asking for initialOffset();
        # the initial offset must be the state at construction, not the
        # live high-water mark, or the first microbatch plans start == end
        self._initial = {"version": self._version, "batch": self._latest_batch}

    # -- commit log -------------------------------------------------------

    def _load_log(self) -> None:
        import os

        if not os.path.exists(self._log_path):
            return
        with open(self._log_path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                self._batches[rec["batch"]] = rec["files"]
                self._latest_batch = max(self._latest_batch, rec["batch"])
                self._version = max(self._version, rec.get("version", -1))
                self._seen.update(f["id"] for f in rec["files"])
                if rec.get("schema"):
                    # restore the schema pin across driver restarts: the
                    # logged manifests' files were written under THIS
                    # schema — a memory-only pin would silently accept a
                    # post-restart schema change and mis-decode replays
                    self._schema_string_seen = rec["schema"]

    def _append_log(self, batch: int, version: int, files: list[dict]) -> None:
        with open(self._log_path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps({
                "batch": batch, "version": version, "files": files,
                # persist the drift pin (see _load_log)
                "schema": getattr(self, "_schema_string_seen", None),
            }) + "\n")
            fh.flush()

    # -- DataSourceStreamReader contract ----------------------------------

    def initialOffset(self) -> dict:
        return dict(self._initial)

    def latestOffset(self) -> dict:
        client, table = _make_client(self.options)
        data = client.get_table_data(table)
        _check_reader_features(data.protocol)
        if _column_mapping_of(data.metadata, self.full_schema):
            # batch reads translate column mapping; the streaming
            # manifest does not persist the per-file translation state
            # yet — refuse loudly rather than mis-read physical columns
            raise DeltaSharingError(
                "column-mapped tables are not supported by the streaming "
                "source; read them with the batch reader")
        _check_schema_drift(self, table, data.metadata.schema_string)
        if data.version is not None:
            self._version = data.version
        new = [f for f in data.files if f.id not in self._seen]
        if new:
            for f in new:
                if f.deletion_vector:  # refuse unresolvable DVs at plan time
                    validate_dv_descriptor(f.deletion_vector, data_url=f.url)
            self._latest_batch += 1
            manifest = [{"id": f.id, "url": f.url, "size": f.size,
                         "partition_values": dict(f.partition_values),
                         "deletion_vector": f.deletion_vector}
                        for f in new]
            self._batches[self._latest_batch] = manifest
            self._seen.update(f.id for f in new)
            self._append_log(self._latest_batch, self._version, manifest)
        return {"version": self._version, "batch": self._latest_batch}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[_FilePartition] = []
        for b in range(start.get("batch", -1) + 1, end.get("batch", -1) + 1):
            manifest = self._batches.get(b)
            if manifest is None:
                self._load_log()  # commit pruned memory; the log is durable
                manifest = self._batches.get(b)
            if manifest is None:
                raise DeltaSharingError(
                    f"cannot replay microbatch {b}: no manifest in the "
                    f"stream commit log at {self._log_path} (log lost or "
                    "truncated) — refusing to guess the original file set")
            for f in manifest:
                parts.append(_FilePartition(
                    f["url"], f["size"], f["id"], f["partition_values"],
                    deletion_vector=f.get("deletion_vector")))
        return parts

    def read(self, partition: _FilePartition) -> Iterator:
        return _read_file_partition(self.options, self.full_schema, partition)

    def commit(self, end: dict) -> None:
        # batches <= end are processed and will never be re-requested;
        # drop them from memory (the JSONL log keeps the durable history)
        done = end.get("batch", -1)
        for b in [b for b in self._batches if b <= done]:
            del self._batches[b]


_CDF_META_FIELDS = (
    T.StructField("_change_type", T.StringType()),
    T.StructField("_commit_version", T.LongType()),
    T.StructField("_commit_timestamp", T.TimestampType()),
)


def _wants_cdf(options) -> bool:
    return str(options.get("readChangeFeed", "")).lower() in ("true", "1")


class DeltaSharingCDFStreamReader(DataSourceStreamReader):
    """Change-Data-Feed microbatch source over the protocol's ``/changes``
    endpoint (``readChangeFeed`` option; Spark's delta CDF streaming
    analogue). Offsets are purely logical — ``{"version": V}`` — so there
    is no local commit log at all: ``partitions(start, end)`` re-lists the
    version range from the server, which is authoritative for replay. A
    replay whose versions the server has vacuumed fails loudly server-side
    rather than silently dropping changes. Each action file is one
    executor partition; add/remove actions get literal
    insert/delete ``_change_type``, ``cdf`` files carry their own."""

    def __init__(self, options, schema: T.StructType):
        self.options = options
        # schema arrives WITH the three CDF meta columns (appended by
        # DeltaSharingDataSource.schema); the file payload schema is the
        # table schema without them
        meta_names = {f.name for f in _CDF_META_FIELDS}
        self.out_schema = schema
        self.base_schema = T.StructType(
            [f for f in schema.fields if f.name not in meta_names])
        start_opt = options.get("startingVersion")
        if start_opt is not None:
            try:
                start_v = int(start_opt)
            except (TypeError, ValueError) as exc:
                raise DeltaSharingError(
                    "startingVersion must be an integer version, got "
                    f"{start_opt!r}") from exc
            # serve changes FROM startingVersion (inclusive)
            self._initial = {"version": start_v - 1}
        else:
            client, table = _make_client(options)
            self._initial = {"version": client.get_table_version(table)}

    def initialOffset(self) -> dict:
        return dict(self._initial)

    def latestOffset(self) -> dict:
        client, table = _make_client(self.options)
        return {"version": client.get_table_version(table)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start.get("version", -1), end.get("version", -1)
        if hi <= lo:
            return []
        client, table = _make_client(self.options)
        changes = client.get_table_changes(
            table, starting_version=lo + 1, ending_version=hi)
        _check_reader_features(changes.protocol)
        if _column_mapping_of(changes.metadata, self.base_schema):
            raise DeltaSharingError(
                "column-mapped tables are not supported by the CDF "
                "streaming source; read them with the batch reader")
        _check_schema_drift(self, table, changes.metadata.schema_string)
        for _, f in changes.actions:
            if f.deletion_vector:  # refuse unresolvable DVs at plan time
                validate_dv_descriptor(f.deletion_vector, data_url=f.url)
        return [
            _CDFFilePartition(f.url, f.size, f.id,
                              dict(f.partition_values), kind,
                              f.version if f.version is not None else hi,
                              # keep None: a missing commit timestamp must
                              # surface as NULL, not a silent 1970 epoch
                              f.timestamp,
                              deletion_vector=f.deletion_vector)
            for kind, f in changes.actions
        ]

    def read(self, partition: _CDFFilePartition):
        import pyarrow as pa

        from datafusion_delta_sharing_spark.sources.reader import (
            _spark_struct_to_arrow_schema,
        )

        file_schema = self.base_schema
        if partition.kind == "cdf":
            file_schema = T.StructType(
                list(self.base_schema.fields)
                + [T.StructField("_change_type", T.StringType())])
        arrow_out = _spark_struct_to_arrow_schema(self.out_schema)
        ct_type = arrow_out.field("_change_type").type
        cv_type = arrow_out.field("_commit_version").type
        cts_type = arrow_out.field("_commit_timestamp").type
        literal_ct = ("insert" if partition.kind == "add" else "delete")
        refresh = lambda: _refresh_cdf_file_action(  # noqa: E731
            self.options, partition.file_id, partition.version)
        for batch in _read_file_partition(self.options, file_schema,
                                          partition, refresh=refresh):
            n = batch.num_rows
            cols = {name: batch.column(i)
                    for i, name in enumerate(batch.schema.names)}
            arrays = []
            for field in self.out_schema.fields:
                if field.name == "_change_type" and field.name not in cols:
                    arrays.append(pa.array([literal_ct] * n, ct_type))
                elif field.name == "_commit_version":
                    arrays.append(pa.array([partition.version] * n, cv_type))
                elif field.name == "_commit_timestamp":
                    ts_us = (partition.timestamp * 1000
                             if partition.timestamp is not None else None)
                    arrays.append(pa.array([ts_us] * n,
                                           type=pa.int64()).cast(cts_type))
                else:
                    arrays.append(cols[field.name].cast(
                        arrow_out.field(field.name).type))
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_out)

    def commit(self, end: dict) -> None:
        pass  # offsets are logical; the server's history is the log


class DeltaSharingDataSource(DataSource):
    """``spark.read.format("deltasharing")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "deltasharing"

    def schema(self) -> T.StructType:
        from datafusion_delta_sharing_spark.sources.schema import schema_from_string

        client, table = _make_client(self.options)
        version, timestamp = _snapshot_pins(self.options)
        if version is not None or timestamp is not None:
            # time travel: the CURRENT metadata may have columns the
            # pinned snapshot's files do not (schema evolution after the
            # pin) — fetch the metadata the snapshot was written with
            # from the same pinned query the readers use. limit_hint=0:
            # only the metadata line matters here
            metadata = client.get_table_data(
                table, version=version, timestamp=timestamp,
                limit_hint=0).metadata
        else:
            _, metadata = client.get_table_metadata(table)
        # remember partition columns for the readers (options travel)
        self.options["partition_columns"] = json.dumps(
            list(metadata.partition_columns))
        base = schema_from_string(metadata.schema_string)
        if _wants_cdf(self.options):
            return T.StructType(list(base.fields) + list(_CDF_META_FIELDS))
        return base

    def reader(self, schema: T.StructType) -> DeltaSharingBatchReader:
        if _wants_cdf(self.options):
            raise DeltaSharingError(
                "readChangeFeed is a streaming option — use readStream, "
                "or DeltaSharingReader.table_changes for a batch CDF read")
        return DeltaSharingBatchReader(self.options, schema)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        if _wants_cdf(self.options):
            return DeltaSharingCDFStreamReader(self.options, schema)
        return DeltaSharingStreamReader(self.options, schema)
