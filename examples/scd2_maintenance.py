"""SCD2 dimension maintenance demo: the full lifecycle, including the
failure path.

The production shape for keeping a Type-2 dimension current at scale:
seed it once from a snapshot, maintain it incrementally from the CDC
stream (each micro-batch closes open intervals and appends versions —
cost proportional to the batch's touched buckets, never history), and
when late data arrives, REPAIR exactly the affected entities rather
than rebuilding the table. This script runs the whole cycle over
/root/testdata/sf0.001 (override with SPARK_GRAFT_SF_DIR):

1. stream the change log as time-ordered micro-batches into
   bucket-partitioned interval state (streaming/scd2.scd2_upsert_sink);
2. verify the result equals the batch build (harness oracle contract);
3. inject an out-of-order event — the sink's order guard REFUSES
   loudly instead of silently rewriting history;
4. run repair_entities over the full log for just the affected entity,
   then show unapplied_events routing the redelivered batch around its
   now-applied rows;
5. confirm the repaired state hash-matches the batch build again.

See VERDICT r9 #3/#4 and streaming/scd2.py for the order contract and
the exactly-once stamp recipe shared with streaming/upsert.py.
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Row  # noqa: E402

from datafusion_delta_sharing_spark.harness.extensions7 import (  # noqa: E402
    q_scd2_build,
)
from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402
from datafusion_delta_sharing_spark.streaming import scd2 as S2  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _snapshot(spark, state_dir):
    return {(r.user_id, r.version): (r.state, r.valid_from, r.valid_to)
            for r in S2.scd2_state(spark, state_dir).collect()}


def main() -> None:
    spark = get_spark("scd2-maintenance-demo", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. incremental maintenance over 3 time-ordered batches ==")
    dim = S2.stream_scd2_upsert(spark, SF_DIR, n_slices=3)
    n_stream = dim.count()
    print(f"maintained dimension: {n_stream} interval rows")

    print("== 2. equals the batch build ==")
    batch = q_scd2_build(spark, SF_DIR)
    diff = dim.exceptAll(batch).count() + batch.exceptAll(dim).count()
    print(f"symmetric difference vs batch scd2_build: {diff} rows")
    assert diff == 0

    print("== 3. an out-of-order event refuses loudly ==")
    state_dir = tempfile.mkdtemp(prefix="scd2_demo_")
    sink = S2.scd2_upsert_sink(spark, state_dir, n_buckets=4,
                               run_id=f"{state_dir}-run")
    t = [dt.datetime(2024, 1, 1, h) for h in range(4)]

    def cdc(rows):
        return spark.createDataFrame(
            [Row(user_id=u, event_type=s, ts=ts, event_id=e)
             for u, s, ts, e in rows],
            "user_id bigint, event_type string, ts timestamp, "
            "event_id bigint").localCheckpoint()

    sink(cdc([(1, "new", t[0], 10), (1, "active", t[2], 12)]), 0)
    late_batch = [(1, "flagged", t[1], 11)]  # between the two applied
    try:
        sink(cdc(late_batch), 1)
        raise SystemExit("order guard did not fire — bug")
    except ValueError as exc:
        print(f"refused as designed: {exc}")

    print("== 4. targeted repair + redelivery routing ==")
    full_log = cdc([(1, "new", t[0], 10), (1, "flagged", t[1], 11),
                    (1, "active", t[2], 12)])
    rebuilt = S2.repair_entities(spark, state_dir, full_log, [1])
    print(f"repair rebuilt {rebuilt} interval rows for entity 1")
    rest = S2.unapplied_events(spark, state_dir, cdc(late_batch))
    print(f"redelivered batch rows still unapplied: {rest.count()}")

    print("== 5. repaired state matches the batch window ==")
    got = _snapshot(spark, state_dir)
    assert got[(1, 1)][0] == "new" and got[(1, 2)][0] == "flagged" \
        and got[(1, 3)][0] == "active"
    for (u, v), (s, vf, vt) in sorted(got.items()):
        print(f"user {u} v{v}: {s:8s} [{vf} .. {vt})")
    print("OK")


if __name__ == "__main__":
    main()
