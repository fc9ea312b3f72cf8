"""Connector queries ON the oracle path (VERDICT r1, next-round item #1).

Round 1 verified the Delta Sharing connector only through pytest + mock
server; every CORRECTNESS row loaded parquet via ``spark.read.parquet``.
These queries close that gap: each one serves the driver's own sf parquet
through the in-process mock Delta Sharing server (``harness/mockserver.py``)
and reads it back through the *real* connector stack —
``DeltaSharingReader.table()`` (reference ``src/datasource/table.rs:174-196``)
and ``spark.read.format("deltasharing")`` — so the DuckDB oracle checks the
whole pipeline end-to-end: REST discovery, NDJSON listing, presigned-URL
ranged HTTP fetch (``mapInArrow``), predicate hints + residual filters,
typed partition-value reconstruction, and catalog SQL rewriting.

Two physical shapes are exercised:

* ``customer`` served as HTTP parquet bytes with ``Range`` support — the
  distributed executor-side fetch path (A1–A3);
* ``orders`` re-staged as a *partitioned* share (partitionBy o_orderstatus,
  data files without the partition column, ``file://`` URLs) — the native
  vectorized scan + per-file partition-value decode path (A20,
  reference ``src/datasource/scan.rs:159-229``).

The mock server lives for the process lifetime (daemon threads), cached per
sf_dir, because the returned DataFrames are lazy: executors contact the
server again at collect time.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from datafusion_delta_sharing_spark.streaming import (
    progress as _STREAM_PROGRESS,
)

_SHARE, _SCHEMA = "bench", "tpch"
_STAGE_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".harness_tmp")

_SERVED: dict[str, dict] = {}  # sf_dir -> {"server", "profile_json"}


def _stage_key(src: str, salt: str = "") -> str:
    """Cache key for a staged copy of source file ``src``: absolute path
    + mtime/size (+ salt). One definition shared by every staging site
    (ADVICE r2: a basename-only key silently reused stale staged data
    when two sf dirs shared a label or the source changed in place)."""
    import hashlib

    src = os.path.abspath(src)
    st = os.stat(src)
    suffix = f":{salt}" if salt else ""
    return hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}{suffix}".encode()
    ).hexdigest()[:16]


def _stage_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write sf orders partitioned by o_orderstatus (one file per status,
    data files WITHOUT the partition column — Delta Sharing semantics where
    partition values travel in file metadata, not parquet data).

    The staging dir is keyed by :func:`_stage_key` (source path +
    mtime/size)."""
    src = os.path.abspath(os.path.join(sf_dir, "orders.parquet"))
    key = _stage_key(src)
    out = os.path.join(_STAGE_ROOT, key, "orders_by_status")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (spark.read.parquet(src)
         .repartition(1)
         .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out))
    return out


def _stage_cdf_customer(spark: SparkSession, sf_dir: str) -> dict:
    """Stage the customer table as three single-file slices keyed by
    c_custkey % 3 — the raw material for a CDF share: slices 1+2 form the
    base snapshot (v1), slice 0 arrives as an ``add`` commit (v2), slice 2
    leaves as a ``remove`` commit (v3). Reconstructing the table from
    base + feed must therefore yield exactly ``c_custkey % 3 != 2`` — a
    result that requires BOTH change kinds to be applied."""
    src = os.path.abspath(os.path.join(sf_dir, "customer.parquet"))
    key = _stage_key(src, salt="cdf")
    out = os.path.join(_STAGE_ROOT, key, "customer_cdf")
    cust = spark.read.parquet(src).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    paths = {}
    for mod in (0, 1, 2):
        slice_dir = os.path.join(out, f"slice{mod}")
        if not os.path.exists(os.path.join(slice_dir, "_SUCCESS")):
            (cust.filter(F.col("c_custkey") % 3 == mod)
             .coalesce(1).write.mode("overwrite").parquet(slice_dir))
        paths[mod] = sorted(glob.glob(
            os.path.join(slice_dir, "*.parquet")))[0]
    return paths


def _stage_cdf_update(spark: SparkSession, sf_dir: str) -> str:
    """Stage the v4 ``cdc`` commit for the full-CDC share: pre/post
    update images for the base-snapshot keys ``c_custkey % 3 == 1 AND
    % 5 == 0`` — the preimage carries the old row, the postimage the new
    ``c_mktsegment = 'UPDATED'``, both in ONE file whose own
    ``_change_type`` column travels with the data (the protocol's
    ``cdc`` action shape, which add/remove actions cannot express)."""
    src = os.path.abspath(os.path.join(sf_dir, "customer.parquet"))
    key = _stage_key(src, salt="cdfu")
    out = os.path.join(_STAGE_ROOT, key, "customer_cdf_update")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        upd = (spark.read.parquet(src)
               .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
               .filter((F.col("c_custkey") % 3 == 1)
                       & (F.col("c_custkey") % 5 == 0)))
        pre = upd.withColumn("_change_type", F.lit("update_preimage"))
        post = (upd.withColumn("c_mktsegment", F.lit("UPDATED"))
                .withColumn("_change_type", F.lit("update_postimage")))
        (pre.unionByName(post).coalesce(1)
         .write.mode("overwrite").parquet(out))
    return sorted(glob.glob(os.path.join(out, "*.parquet")))[0]


def _stage_dv_customer(sf_dir: str) -> tuple[dict, list]:
    """Split customer (projected to 3 columns) into two parquet blobs and
    build deletion vectors marking the positions of rows with
    c_custkey % 7 == 0 — file 0 with an inline ('i') Z85-roaring
    descriptor, file 1 with an on-file ('p') framed DV served behind its
    own URL. Row order inside each blob is the source parquet's, so the
    deleted POSITIONS correspond exactly to the keys the oracle
    anti-filters (the reference drops the deletionVector field entirely,
    ``src/client/action.rs:136-149``; this is the beyond-parity path).

    Pure pyarrow (no Spark write) so the blob row order is deterministic;
    returns ({served_path: bytes}, [file dicts with None urls])."""
    import io

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_delta_sharing_spark.sources import dv as DV

    cols = ["c_custkey", "c_name", "c_acctbal"]
    src = os.path.join(sf_dir, "customer.parquet")
    if os.path.isdir(src):
        parts = sorted(glob.glob(os.path.join(src, "*.parquet")))
        tbl = pa.concat_tables(pq.read_table(p, columns=cols) for p in parts)
    else:
        tbl = pq.read_table(src, columns=cols)
    half = tbl.num_rows // 2
    halves = [tbl.slice(0, half), tbl.slice(half)]

    blobs: dict[str, bytes] = {}
    positions = []
    for i, t in enumerate(halves):
        sink = io.BytesIO()
        # small row groups force multiple Arrow batches per file, so the
        # executor-side per-file position counter crosses batch boundaries
        pq.write_table(t, sink, row_group_size=max(1, t.num_rows // 4 or 1))
        blobs[f"/customer-dv-{i}.parquet"] = sink.getvalue()
        keys = t.column("c_custkey").to_numpy()
        positions.append(np.nonzero(keys % 7 == 0)[0])

    dv_data = DV.encode_dv_data(positions[1], use_runs=True)
    dv_file, offsets = DV.encode_dv_file([dv_data])
    blobs["/customer-dv.bin"] = dv_file
    files = [
        {"id": "customer-dv-0", "url": None,
         "size": len(blobs["/customer-dv-0.parquet"]),
         "partition_values": {},
         "deletion_vector": DV.inline_descriptor(positions[0])},
        {"id": "customer-dv-1", "url": None,
         "size": len(blobs["/customer-dv-1.parquet"]),
         "partition_values": {},
         "deletion_vector": {"storageType": "p",
                             "pathOrInlineDv": None,  # needs base_url
                             "offset": offsets[0],
                             "sizeInBytes": len(dv_data),
                             "cardinality": int(len(positions[1]))}},
    ]
    return blobs, files


def _ensure_served(spark: SparkSession, sf_dir: str) -> dict:
    if sf_dir in _SERVED:
        return _SERVED[sf_dir]
    import json

    from datafusion_delta_sharing_spark.harness.mockserver import (
        MockSharingServer,
        MockTable,
    )

    customer_path = f"{sf_dir}/customer.parquet"
    # driver testdata is a single parquet file; scale-probe dirs
    # (tools/make_scale_data.py) are directory-parquet — serve every part
    # file as its own shared file either way (a multi-file share is the
    # realistic shape: one presigned URL per data file)
    if os.path.isdir(customer_path):
        customer_parts = sorted(glob.glob(
            os.path.join(customer_path, "*.parquet")))
    else:
        customer_parts = [customer_path]
    customer_blobs = {}
    customer_files = []
    for i, path in enumerate(customer_parts):
        with open(path, "rb") as fh:
            blob = fh.read()
        customer_blobs[f"/customer-{i}.parquet"] = blob
        customer_files.append({"id": f"customer-{i}",
                               "url": None,  # filled below (needs base_url)
                               "size": len(blob),
                               "partition_values": {}})
    customer_schema = spark.read.parquet(customer_path).schema.json()

    orders_dir = _stage_partitioned_orders(spark, sf_dir)
    orders_schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema.json()
    order_files = []
    for path in sorted(glob.glob(os.path.join(
            orders_dir, "o_orderstatus=*", "*.parquet"))):
        import pyarrow.parquet as _pq

        status = os.path.basename(os.path.dirname(path)).split("=", 1)[1]
        order_files.append({
            "id": f"orders-{status}-{os.path.basename(path)}",
            "url": f"file://{path}",
            "size": os.path.getsize(path),
            "partition_values": {"o_orderstatus": status},
            # real servers ship numRecords stats per file action; the
            # metadata-only aggregates (connector_meta_counts) need them
            "stats": json.dumps(
                {"numRecords": _pq.ParquetFile(path).metadata.num_rows}),
        })

    cdf_paths = _stage_cdf_customer(spark, sf_dir)
    cdf_schema = spark.read.parquet(cdf_paths[1]).schema.json()

    def _cdf_file(mod: int) -> dict:
        return {"id": f"cdf-slice{mod}",
                "url": f"file://{cdf_paths[mod]}",
                "size": os.path.getsize(cdf_paths[mod]),
                "partition_values": {}}

    cdf_table = MockTable(share=_SHARE, schema=_SCHEMA, name="customer_cdf",
                          schema_string=cdf_schema,
                          files=[_cdf_file(1), _cdf_file(2)])
    cdf_table.changes.extend([
        {"kind": "add", "version": 2, "timestamp": 1_700_000_000_000,
         **_cdf_file(0)},
        {"kind": "remove", "version": 3, "timestamp": 1_700_000_060_000,
         **_cdf_file(2)},
    ])

    # the FULL three-kind CDC history (connector_cdf_scd2): the same
    # base snapshot and add/remove commits, plus a v4 ``cdc`` commit
    # whose file carries its own _change_type column (update pre/post
    # images for the % 3 == 1 AND % 5 == 0 keys)
    update_path = _stage_cdf_update(spark, sf_dir)
    cdf_full = MockTable(share=_SHARE, schema=_SCHEMA,
                         name="customer_cdf_full",
                         schema_string=cdf_schema,
                         files=[_cdf_file(1), _cdf_file(2)])
    cdf_full.changes.extend([
        {"kind": "add", "version": 2, "timestamp": 1_700_000_000_000,
         **_cdf_file(0)},
        {"kind": "remove", "version": 3, "timestamp": 1_700_000_060_000,
         **_cdf_file(2)},
        {"kind": "cdf", "version": 4, "timestamp": 1_700_000_120_000,
         "id": "cdf-update4", "url": f"file://{update_path}",
         "size": os.path.getsize(update_path), "partition_values": {}},
    ])

    dv_blobs, dv_files = _stage_dv_customer(sf_dir)
    dv_schema = spark.read.parquet(customer_path).select(
        "c_custkey", "c_name", "c_acctbal").schema.json()

    # time-travel share over the SAME staged slices: snapshot v5 held
    # slices 1+2, the latest (v7) holds 0+1 — so v5 -> latest adds
    # slice 0 and drops slice 2
    tt_table = MockTable(share=_SHARE, schema=_SCHEMA, name="customer_tt",
                         schema_string=cdf_schema,
                         files=[_cdf_file(0), _cdf_file(1)],
                         history={5: [_cdf_file(1), _cdf_file(2)]})

    server = MockSharingServer(
        [
            MockTable(share=_SHARE, schema=_SCHEMA, name="customer",
                      schema_string=customer_schema,
                      files=customer_files),
            MockTable(share=_SHARE, schema=_SCHEMA, name="orders",
                      schema_string=orders_schema,
                      partition_columns=["o_orderstatus"],
                      files=order_files),
            cdf_table,
            cdf_full,
            MockTable(share=_SHARE, schema=_SCHEMA, name="customer_dv",
                      schema_string=dv_schema, files=dv_files),
            tt_table,
        ],
        parquet_bytes={**customer_blobs, **dv_blobs},
    )
    server.__enter__()  # stays up for the process lifetime (daemon thread)
    # resolve tables by NAME, not list position (r10 review: inserting
    # cdf_full silently shifted the old hard-coded [3] off customer_dv)
    by_name = {t.name: t for t in server.tables}
    for i, f in enumerate(by_name["customer"].files):
        f["url"] = f"{server.base_url}/customer-{i}.parquet"
    for i, f in enumerate(by_name["customer_dv"].files):
        f["url"] = f"{server.base_url}/customer-dv-{i}.parquet"
    by_name["customer_dv"].files[1]["deletion_vector"]["pathOrInlineDv"] = (
        f"{server.base_url}/customer-dv.bin")
    # additive: the mock accepts the static bearer token AND any token
    # it issued via /oauth/token, so enabling OAuth never breaks the
    # bearer-profile queries sharing this server
    server.oauth = {"client_id": "bench-cid",
                    "client_secret": "bench-oauth-fixture",
                    "expires_in": 3600}
    oauth_doc = {"shareCredentialsVersion": 2,
                 "type": "oauth_client_credentials",
                 "endpoint": server.endpoint,
                 "tokenEndpoint": f"{server.base_url}/oauth/token",
                 "clientId": "bench-cid",
                 "clientSecret": "bench-oauth-fixture"}
    state = {"server": server,
             "profile_json": json.dumps(server.profile_doc()),
             "oauth_profile_json": json.dumps(oauth_doc)}
    _SERVED[sf_dir] = state
    return state


def _reader(spark: SparkSession, sf_dir: str):
    from datafusion_delta_sharing_spark.client import DeltaSharingClient
    from datafusion_delta_sharing_spark.profile import Profile
    from datafusion_delta_sharing_spark.sources.reader import DeltaSharingReader

    state = _ensure_served(spark, sf_dir)
    profile = Profile.from_json(state["profile_json"])
    return DeltaSharingReader(spark, DeltaSharingClient(profile))


# -- queries ---------------------------------------------------------------


def q_connector_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection through DeltaSharingReader.table() over
    HTTP-served parquet: hints pushed to the server, ranged executor fetch,
    residual filter re-applied (A1-A5)."""
    return _reader(spark, sf_dir).table(
        f"{_SHARE}.{_SCHEMA}.customer",
        predicate="c_acctbal >= 1000.0",
        columns=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
    )


def q_connector_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned share over file:// URLs: per-file partition-value decode
    re-attaches o_orderstatus (absent from the data files), predicate on the
    partition column prunes the listing server-side + stats-side (A20)."""
    df = _reader(spark, sf_dir).table(
        f"{_SHARE}.{_SCHEMA}.orders",
        predicate="o_orderstatus = 'F'",
    )
    return df.filter(F.col("o_totalprice") > 150000.0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
        "o_orderpriority",
    )


def q_connector_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format("deltasharing") (Python DataSource V2 path):
    pushFilters -> jsonPredicateHints, per-file input partitions, Arrow
    batch read on executors; aggregation on top proves the rows compose
    with the relational engine."""
    from datafusion_delta_sharing_spark.sources.datasource import (
        DeltaSharingDataSource,
    )

    # the driver builds its own session without this conf; Spark 4 refuses to
    # plan a Python data source that implements pushFilters() while it is
    # false ([DATA_SOURCE_PUSHDOWN_DISABLED]) — it is runtime-settable.
    # get_spark() sessions (bench/tests) already set it at build time, so
    # this is a no-op there; in the driver's session it stays enabled for
    # the rest of the run — restoring it here would be unsafe (the returned
    # DataFrame plans/executes lazily, after this function returns), and no
    # registry query depends on the default-false path.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    state = _ensure_served(spark, sf_dir)
    spark.dataSource.register(DeltaSharingDataSource)
    df = (spark.read.format("deltasharing")
          .option("profile_json", state["profile_json"])
          .option("table", f"{_SHARE}.{_SCHEMA}.customer")
          .load())
    return (df.filter(F.col("c_acctbal") > 0)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
                 F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal")))


def q_connector_catalog_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-part-name SQL through DeltaSharingCatalog: lazy view
    registration over the connector scan, FQN rewrite outside string
    literals, then a join+agg across TWO shared tables (reference
    examples/query_from_catalog.rs:21)."""
    from datafusion_delta_sharing_spark.catalog import DeltaSharingCatalog
    from datafusion_delta_sharing_spark.profile import Profile

    state = _ensure_served(spark, sf_dir)
    catalog = DeltaSharingCatalog(spark, Profile.from_json(state["profile_json"]))
    return catalog.sql(f"""
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 4) AS revenue
        FROM {_SHARE}.{_SCHEMA}.orders o
        JOIN {_SHARE}.{_SCHEMA}.customer c ON c.c_custkey = o.o_custkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY c.c_mktsegment
    """)


def q_connector_cdf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC consumption end-to-end (A34): a stale snapshot (slices 1+2 of
    customer) plus the real ``/changes`` feed (add slice 0 at v2, remove
    slice 2 at v3) reconstructed with operators/cdc.apply_changes. The
    result is right ONLY if both the insert and the delete commit are
    fetched through the protocol and applied in version order."""
    from datafusion_delta_sharing_spark.operators import cdc as CDC

    reader = _reader(spark, sf_dir)
    base = reader.table(f"{_SHARE}.{_SCHEMA}.customer_cdf")
    changes = reader.table_changes(f"{_SHARE}.{_SCHEMA}.customer_cdf",
                                   starting_version=2)
    return CDC.apply_changes(base, changes, ["c_custkey"])


def q_connector_dv_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion vectors applied end-to-end — the repo's flagship
    beyond-reference capability (the ref's ``action.rs:136-149`` silently
    drops the deletionVector field and would resurrect deleted rows):
    customer served as two HTTP parquet blobs, file 0 carrying an inline
    ('i') Z85-roaring descriptor and file 1 an on-file ('p') framed DV
    behind its own presigned URL, both deleting the positions of rows
    with c_custkey % 7 == 0. The result is right only if BOTH DV codecs
    decode executor-side and the position mask composes with the
    downstream filter."""
    df = _reader(spark, sf_dir).table(f"{_SHARE}.{_SCHEMA}.customer_dv")
    return (df.filter(F.col("c_acctbal") > 0)
            .select("c_custkey", "c_name", "c_acctbal"))


def q_connector_time_travel_diff(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Snapshot time travel end-to-end (beyond reference: the protocol's
    ``version`` query-body pin, never sent by the ref): read the SAME
    share at version 5 (slices 1+2 of customer) and at the latest
    version (slices 0+1), and diff — the added/removed row sets are
    right only if the version pin actually reaches the server and both
    listings resolve to their own snapshot's files. This is the
    training-data lineage workflow: 'what changed between the snapshot
    my last run read and today?'."""
    reader = _reader(spark, sf_dir)
    name = f"{_SHARE}.{_SCHEMA}.customer_tt"
    old = reader.table(name, version=5).select("c_custkey", "c_name")
    new = reader.table(name).select("c_custkey", "c_name")
    added = (new.join(old.select("c_custkey"), "c_custkey", "left_anti")
             .withColumn("change", F.lit("added")))
    removed = (old.join(new.select("c_custkey"), "c_custkey", "left_anti")
               .withColumn("change", F.lit("removed")))
    return added.unionByName(removed).select("change", "c_custkey",
                                             "c_name")


def q_connector_meta_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregates end-to-end (beyond reference: the ref
    parses numRecords stats and drops them, action.rs:180-183): the
    GROUP BY partition-key COUNT(*) and the total COUNT(*) answered from
    the file listing alone — zero parquet bytes move. At 100 TB this is
    a metadata round-trip instead of a full-table scan. The row counts
    are right only if every file action's stats survive the NDJSON round
    trip and the DV-cardinality/exactness contract holds — the oracle is
    the real scan-side GROUP BY."""
    reader = _reader(spark, sf_dir)
    name = f"{_SHARE}.{_SCHEMA}.orders"
    per = reader.partition_row_counts(name).select(
        "o_orderstatus", F.col("row_count").alias("n_rows"))
    total = reader.count_rows(name)
    total_df = spark.createDataFrame(
        [("__ALL__", total)], schema="o_orderstatus string, n_rows bigint")
    return per.unionByName(total_df)


def q_connector_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDF STREAMING source end-to-end (beyond reference: the ref's
    ``/changes`` client is ``todo!()``): ``spark.readStream`` over the
    real protocol with logical version offsets — the v2 add commit
    (slice 0) and the v3 remove commit (slice 2) arrive as micro-batches
    tagged insert/delete, materialize through an executor-side parquet
    sink, and aggregate per (change type, commit version). The counts
    are right only if the stream replays the server's history from
    ``startingVersion`` and maps both action kinds to CDF metadata."""
    import json

    from datafusion_delta_sharing_spark.sources.datasource import (
        DeltaSharingDataSource,
    )
    from datafusion_delta_sharing_spark.streaming.windows import (
        materialize_stream,
    )

    state = _ensure_served(spark, sf_dir)
    spark.dataSource.register(DeltaSharingDataSource)
    stream = (spark.readStream.format("deltasharing")
              .option("profile_json", state["profile_json"])
              .option("table", f"{_SHARE}.{_SCHEMA}.customer_cdf")
              .option("readChangeFeed", "true")
              .option("startingVersion", "2").load())
    rows = materialize_stream(stream, "append", "connector_cdf_stream")
    return (rows.groupBy("_change_type", "_commit_version")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum("c_custkey").cast("long").alias("sum_keys")))


def q_connector_cdf_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full lakehouse CDC -> dimension workflow the reference stubs
    at ``src/client/mod.rs:384-386`` (VERDICT r9 #4): an SCD2 dimension
    tracking ``c_mktsegment``, seeded from the share's base snapshot
    and then MAINTAINED by ALL THREE change kinds of the real
    ``/changes`` protocol through Structured Streaming.

    Composition of two already-attested pieces: the ``deltasharing``
    CDF streaming source (``connector_cdf_stream``'s path — version
    offsets over the mock server's commit history) feeds
    ``streaming/scd2.scd2_upsert_sink`` via foreachBatch. Seed = the
    base snapshot (slices 1+2) as v1 segment states under its own
    run_id; then over HTTP arrive the v2 ``add`` commit (slice 0
    inserts), the v3 ``remove`` commit (slice 2 -> '<deleted>' versions
    closing open v1 intervals cross-batch), and the v4 ``cdc`` commit —
    a file carrying its own ``_change_type`` column with update
    pre/post images (% 3 == 1 AND % 5 == 0 keys -> segment 'UPDATED');
    preimages are dropped, postimages open new versions. Event
    time/tie-break derive from the commit version
    (ts = timestamp_seconds(version), event_id = version) — the CDC log
    order, so the sink's order contract holds by construction. The
    oracle is the batch interval build over the same commit-derived
    event log expressed directly on the customer table."""
    import tempfile as _tmp

    from datafusion_delta_sharing_spark.sources.datasource import (
        DeltaSharingDataSource,
    )
    from datafusion_delta_sharing_spark.streaming.scd2 import (
        scd2_state, scd2_upsert_sink,
    )

    state = _ensure_served(spark, sf_dir)
    reader = _reader(spark, sf_dir)
    state_dir = _tmp.mkdtemp(prefix="cdf_scd2_state_")
    ckpt = _tmp.mkdtemp(prefix="cdf_scd2_ckpt_")

    def _events(df: DataFrame, version_col) -> DataFrame:
        # the SCD2 state IS the segment; a delete closes the row into a
        # terminal '<deleted>' version. Update preimages are the old
        # row restated, not an event — only postimages advance history.
        return (df.filter(F.col("_change_type") != "update_preimage")
                .select(
                    F.col("c_custkey").cast("bigint").alias("user_id"),
                    F.when(F.col("_change_type") == "delete",
                           F.lit("<deleted>"))
                    .otherwise(F.col("c_mktsegment"))
                    .alias("event_type"),
                    F.timestamp_seconds(version_col).alias("ts"),
                    version_col.cast("bigint").alias("event_id")))

    # initial load: the base snapshot (slices 1+2) as v1 segment
    # states, merged under its own run_id (a one-off backfill run)
    base = (reader.table(f"{_SHARE}.{_SCHEMA}.customer_cdf_full")
            .withColumn("_change_type", F.lit("insert")))
    # no extra checkpoint here (r10): the sink's own (lazy) events
    # checkpoint already materializes the HTTP-fetched batch exactly
    # once before its first reuse
    scd2_upsert_sink(spark, state_dir, n_buckets=8,
                     run_id=f"{ckpt}-seed")(
        _events(base, F.lit(1)), 0)

    spark.dataSource.register(DeltaSharingDataSource)
    stream = (spark.readStream.format("deltasharing")
              .option("profile_json", state["profile_json"])
              .option("table", f"{_SHARE}.{_SCHEMA}.customer_cdf_full")
              .option("readChangeFeed", "true")
              .option("startingVersion", "2").load())
    import time

    t0 = time.perf_counter()
    query = (_events(stream, F.col("_commit_version"))
             .writeStream.outputMode("update")
             .foreachBatch(scd2_upsert_sink(spark, state_dir,
                                            n_buckets=8, run_id=ckpt))
             .option("checkpointLocation", ckpt)
             .start())
    try:
        query.processAllAvailable()
        _STREAM_PROGRESS.note("connector_cdf_scd2", query,
                              wall_s=time.perf_counter() - t0)
    finally:
        query.stop()
    return scd2_state(spark, state_dir)


def q_connector_snapshot_stream(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The snapshot-diff STREAMING source end-to-end: ``spark.readStream``
    over the share without readChangeFeed — the source lists the current
    snapshot per micro-batch and emits newly-appeared files (version-
    numbered offsets; replay re-lists from the server, no local manifest).
    Here the customer share is static HTTP parquet, so one micro-batch
    carries the whole snapshot through the ranged executor fetch; the
    per-segment aggregate is right only if every file's bytes arrive
    through the streaming path."""
    import json

    from datafusion_delta_sharing_spark.functions.money import cents
    from datafusion_delta_sharing_spark.sources.datasource import (
        DeltaSharingDataSource,
    )
    from datafusion_delta_sharing_spark.streaming.windows import (
        materialize_stream,
    )

    state = _ensure_served(spark, sf_dir)
    spark.dataSource.register(DeltaSharingDataSource)
    stream = (spark.readStream.format("deltasharing")
              .option("profile_json", state["profile_json"])
              .option("table", f"{_SHARE}.{_SCHEMA}.customer").load())
    rows = materialize_stream(stream, "append",
                              "connector_snapshot_stream")
    return (rows.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 F.sum(cents(F.col("c_acctbal"))).cast("long")
                 .alias("bal_cents")))


def q_connector_oauth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The credentials-v2 OAuth path end-to-end (beyond reference: the
    ref is v1 bearer-only, profile.rs:80-95): a client-credentials
    profile fetches its token from the mock's ``/oauth/token`` and the
    listing/metadata requests authenticate with it — the aggregate is
    right only if every LISTING request carried a valid issued token
    (the server 401s anything else on those routes). The executor-side
    parquet GETs are presigned-URL fetches and carry no Authorization by
    protocol design (one OAuth grant authorizes a listing, and the URLs
    it returns are themselves the data credential) — the mock mirrors
    that by serving parquet paths before its auth check, and
    tests/test_reader_catalog.py pins exactly one issued token for the
    whole chain (ADVICE r7)."""
    from datafusion_delta_sharing_spark.client import DeltaSharingClient
    from datafusion_delta_sharing_spark.profile import Profile
    from datafusion_delta_sharing_spark.sources.reader import (
        DeltaSharingReader,
    )

    state = _ensure_served(spark, sf_dir)
    profile = Profile.from_json(state["oauth_profile_json"])
    reader = DeltaSharingReader(spark, DeltaSharingClient(profile))
    # vacuously-true predicate: exercises the hint + residual machinery
    # under OAuth without changing the row set (acctbal CAN be negative)
    df = reader.table(f"{_SHARE}.{_SCHEMA}.customer",
                      predicate="c_custkey >= 0",
                      columns=["c_custkey", "c_mktsegment"])
    return (df.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 F.min("c_custkey").alias("min_key"),
                 F.max("c_custkey").alias("max_key")))


def q_connector_bearer_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bearer ``expirationTime`` enforcement end-to-end (VERDICT r7 #8;
    reference parity: src/profile.rs:317-356 rejects expired tokens at
    authorize time). Two profiles over the same share: a future-dated
    bearer lists and aggregates normally (the n_customers column), and a
    PAST-dated bearer must be rejected by the reader's first request with
    the documented ProfileError naming the expiry — before any bytes
    move. The booleans are computed from the actual raised error, so a
    regression that stops checking expirationTime (or garbles the
    message) flips them and the hash mismatches. The deterministic
    crossing-expiry scenario (same reader, token expiring mid-session
    between two requests) is pinned in
    tests/test_harness_connector.py::test_bearer_expiry_mid_session."""
    import json

    from datafusion_delta_sharing_spark.client import DeltaSharingClient
    from datafusion_delta_sharing_spark.errors import ProfileError
    from datafusion_delta_sharing_spark.profile import Profile
    from datafusion_delta_sharing_spark.sources.reader import (
        DeltaSharingReader,
    )

    state = _ensure_served(spark, sf_dir)
    doc = json.loads(state["profile_json"])
    live = Profile.from_json(json.dumps(
        {**doc, "expirationTime": "2099-01-01T00:00:00Z"}))
    counts = (DeltaSharingReader(spark, DeltaSharingClient(live))
              .table(f"{_SHARE}.{_SCHEMA}.customer",
                     columns=["c_custkey"])
              .agg(F.count(F.lit(1)).cast("long").alias("n_customers")))
    expired = Profile.from_json(json.dumps(
        {**doc, "expirationTime": "2020-01-01T00:00:00Z"}))
    rejected = mentions = False
    try:
        DeltaSharingReader(spark, DeltaSharingClient(expired)).table(
            f"{_SHARE}.{_SCHEMA}.customer")
    except ProfileError as exc:
        rejected = True
        mentions = "expired" in str(exc)
    flags = spark.createDataFrame(
        [(rejected, mentions)],
        "expired_rejected boolean, error_mentions_expiry boolean")
    return counts.join(F.broadcast(flags))


QUERIES = {
    "connector_flagship": q_connector_flagship,
    "connector_bearer_expiry": q_connector_bearer_expiry,
    "connector_meta_counts": q_connector_meta_counts,
    "connector_cdf_stream": q_connector_cdf_stream,
    "connector_snapshot_stream": q_connector_snapshot_stream,
    "connector_oauth": q_connector_oauth,
    "connector_time_travel_diff": q_connector_time_travel_diff,
    "connector_dv_apply": q_connector_dv_apply,
    "connector_partitioned": q_connector_partitioned,
    "connector_datasource": q_connector_datasource,
    "connector_catalog_sql": q_connector_catalog_sql,
    "connector_cdf_apply": q_connector_cdf_apply,
    "connector_cdf_scd2": q_connector_cdf_scd2,
}

ORACLES = {
    "connector_bearer_expiry": """
        SELECT CAST(count(*) AS BIGINT) AS n_customers,
               TRUE AS expired_rejected,
               TRUE AS error_mentions_expiry
        FROM customer
    """,
    "connector_flagship": """
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_acctbal >= 1000.0
    """,
    "connector_meta_counts": """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows
        FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT '__ALL__' AS o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders
    """,
    "connector_oauth": """
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               min(c_custkey) AS min_key,
               max(c_custkey) AS max_key
        FROM customer GROUP BY c_mktsegment
    """,
    "connector_snapshot_stream": """
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS bal_cents
        FROM customer GROUP BY c_mktsegment
    """,
    "connector_cdf_stream": """
        SELECT 'insert' AS _change_type,
               CAST(2 AS BIGINT) AS _commit_version,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(c_custkey) AS BIGINT) AS sum_keys
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT 'delete' AS _change_type,
               CAST(3 AS BIGINT) AS _commit_version,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(c_custkey) AS BIGINT) AS sum_keys
        FROM customer WHERE c_custkey % 3 = 2
    """,
    "connector_time_travel_diff": """
        SELECT 'added' AS change, c_custkey, c_name
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT 'removed' AS change, c_custkey, c_name
        FROM customer WHERE c_custkey % 3 = 2
    """,
    "connector_dv_apply": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_custkey % 7 <> 0 AND c_acctbal > 0
    """,
    "connector_partitioned": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
    """,
    "connector_datasource": """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               round(CAST(sum(c_acctbal) AS DOUBLE), 4) AS sum_acctbal,
               round(CAST(avg(c_acctbal) AS DOUBLE), 4) AS avg_acctbal
        FROM customer WHERE c_acctbal > 0
        GROUP BY c_mktsegment
    """,
    "connector_catalog_sql": """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               round(CAST(sum(o.o_totalprice) AS DOUBLE), 4) AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY c.c_mktsegment
    """,
    # base (mod 1, 2) + add (mod 0) - remove (mod 2) = mod != 2
    "connector_cdf_apply": """
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 != 2
    """,
    # the maintained dimension == the batch SCD2 interval build over the
    # commit-derived event log: base snapshot (mod 1, 2) carries its
    # segment at v1, the v2 add commit inserts mod 0's segments, the v3
    # remove commit closes mod 2 into '<deleted>' versions, and the v4
    # cdc commit's update postimages move (mod 3 == 1 AND mod 5 == 0)
    # keys to segment 'UPDATED'. ts/event_id derive from the commit
    # version on both engines.
    "connector_cdf_scd2": """
        SELECT user_id, version, state, valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM (
            SELECT user_id, state, ts AS valid_from,
                   lead(ts) OVER w AS valid_to,
                   CAST(row_number() OVER w AS BIGINT) AS version
            FROM (
                SELECT CAST(c_custkey AS BIGINT) AS user_id,
                       c_mktsegment AS state,
                       make_timestamp(1 * 1000000) AS ts,
                       CAST(1 AS BIGINT) AS event_id
                FROM customer WHERE c_custkey % 3 != 0
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), c_mktsegment,
                       make_timestamp(2 * 1000000), CAST(2 AS BIGINT)
                FROM customer WHERE c_custkey % 3 = 0
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), '<deleted>',
                       make_timestamp(3 * 1000000), CAST(3 AS BIGINT)
                FROM customer WHERE c_custkey % 3 = 2
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT), 'UPDATED',
                       make_timestamp(4 * 1000000), CAST(4 AS BIGINT)
                FROM customer
                WHERE c_custkey % 3 = 1 AND c_custkey % 5 = 0
            )
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts NULLS LAST, event_id NULLS LAST)
        )
    """,
}
