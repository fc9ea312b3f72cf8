"""CDC sync loop demo: keep a local mirror of a shared table fresh
without ever re-reading the full share.

The production shape for consuming a Delta Sharing table at 100 TB:
materialize one full snapshot ONCE, then per sync cycle fetch only the
``/changes`` feed since the last synced version and merge it with
``operators/cdc.apply_changes`` (last action per key wins by commit
version). The feed is small relative to the table — that is the point of
CDC — so each cycle's cost is proportional to the churn, not the table.

This script stages a three-commit history on the in-process mock sharing
server (tests/mock_server.py), takes the v1 snapshot, then applies the
v2 (insert) and v3 (delete) commits through the REAL protocol path
(client -> NDJSON actions -> version-grouped scan) and shows the mirror
converging to the provider's current state.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from datafusion_delta_sharing_spark.client import DeltaSharingClient  # noqa: E402
from datafusion_delta_sharing_spark.operators import cdc as CDC  # noqa: E402
from datafusion_delta_sharing_spark.profile import Profile  # noqa: E402
from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402
from datafusion_delta_sharing_spark.sources.reader import DeltaSharingReader  # noqa: E402

SCHEMA = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": False, "metadata": {}},
    {"name": "qty", "type": "long", "nullable": True, "metadata": {}},
]})


def _file(tmp, name, ids, qtys):
    path = Path(tmp) / name
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                             "qty": pa.array(qtys, pa.int64())}), path)
    return {"id": name, "url": f"file://{path}",
            "size": path.stat().st_size, "partition_values": {}}


def main() -> None:
    from tests.mock_server import MockSharingServer, MockTable

    spark = get_spark("cdc-sync", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="cdc_sync_")

    base = _file(tmp, "base.parquet", [1, 2, 3], [10, 20, 30])
    added = _file(tmp, "add.parquet", [4, 5], [40, 50])
    removed = _file(tmp, "rm.parquet", [2], [20])

    table = MockTable(share="s", schema="d", name="items",
                      schema_string=SCHEMA, files=[base])
    table.changes.extend([
        {"kind": "add", "version": 2, "timestamp": 1_700_000_000_000,
         **added},
        {"kind": "remove", "version": 3, "timestamp": 1_700_000_060_000,
         **removed},
    ])

    with MockSharingServer([table]) as srv:
        reader = DeltaSharingReader(
            spark, DeltaSharingClient(Profile.from_json(srv.profile_doc())))

        print("== v1 snapshot (materialized once) ==")
        mirror = reader.table("s.d.items")
        mirror.orderBy("id").show()

        print("== /changes since v2 (the only data this cycle fetches) ==")
        feed = reader.table_changes("s.d.items", starting_version=2)
        feed.orderBy("_commit_version", "id").show()

        print("== mirror after apply_changes (== provider state) ==")
        CDC.apply_changes(mirror, feed, ["id"]).orderBy("id").show()

    spark.stop()


if __name__ == "__main__":
    main()
