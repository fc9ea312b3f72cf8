"""End-to-end example: a Delta Sharing server -> Spark DataFrames.

Mirrors the reference's flagship flow (examples/query_from_catalog.rs): a
profile file + ``share.schema.table`` name -> registered table -> SQL with
projection + filter + limit. Here the server is the in-process mock from
``harness/mockserver.py`` serving real parquet bytes over HTTP with Range
requests, so the whole distributed read path (client -> jsonPredicateHints ->
stats pruning -> mapInArrow ranged fetch -> partition reconstruction) runs
exactly as it would against a real endpoint.

Run:  python examples/quickstart.py
"""

import io
import json
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datafusion_delta_sharing_spark import (  # noqa: E402
    DeltaSharingCatalog,
    DeltaSharingReader,
    Profile,
)
from datafusion_delta_sharing_spark.session import get_spark  # noqa: E402
from datafusion_delta_sharing_spark.harness.mockserver import (  # noqa: E402
    MockSharingServer,
    MockTable,
)

SCHEMA_STRING = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": False, "metadata": {}},
    {"name": "amount", "type": "double", "nullable": True, "metadata": {}},
    {"name": "day", "type": "date", "nullable": True, "metadata": {}},
]})


def parquet_blob(ids, amounts) -> bytes:
    sink = io.BytesIO()
    pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                             "amount": pa.array(amounts, pa.float64())}), sink)
    return sink.getvalue()


def main() -> None:
    spark = get_spark("quickstart", cpus=4)
    blobs = {
        "/data/day1.parquet": parquet_blob([1, 2, 3], [10.0, 20.0, 30.0]),
        "/data/day2.parquet": parquet_blob([4, 5, 6], [40.0, 50.0, 60.0]),
    }
    table = MockTable(
        share="sales", schema="emea", name="orders",
        schema_string=SCHEMA_STRING, partition_columns=["day"], files=[])

    with MockSharingServer([table], parquet_bytes=blobs) as server:
        table.files.extend([
            {"id": "f1", "url": f"{server.base_url}/data/day1.parquet",
             "size": len(blobs["/data/day1.parquet"]),
             "partition_values": {"day": "2021-04-28"},
             "stats": json.dumps({"numRecords": 3, "minValues": {"id": 1},
                                  "maxValues": {"id": 3}, "nullCount": {"id": 0}})},
            {"id": "f2", "url": f"{server.base_url}/data/day2.parquet",
             "size": len(blobs["/data/day2.parquet"]),
             "partition_values": {"day": "2021-04-29"},
             "stats": json.dumps({"numRecords": 3, "minValues": {"id": 4},
                                  "maxValues": {"id": 6}, "nullCount": {"id": 0}})},
        ])

        with tempfile.TemporaryDirectory() as tmp:
            profile_path = Path(tmp) / "demo.share"
            profile_path.write_text(json.dumps(server.profile_doc()))

            print("== full scan via connection string ==")
            df = DeltaSharingReader.load(spark, f"{profile_path}#sales.emea.orders")
            df.orderBy("id").show()

            print("== predicate + limit (predicate hints pushed; limit exact client-side) ==")
            reader = DeltaSharingReader(
                spark, __import__("datafusion_delta_sharing_spark.client",
                                  fromlist=["DeltaSharingClient"]
                                  ).DeltaSharingClient(
                                      Profile.from_path(profile_path)))
            filtered = reader.table("sales.emea.orders",
                                    predicate="id >= 4 AND day = '2021-04-29'",
                                    limit=2)
            filtered.orderBy("id").show()
            query_bodies = [r["body"] for r in server.requests
                            if r["path"].endswith("/query") and r["body"]]
            print("last query body:", query_bodies[-1])

            print("== catalog + three-part-name SQL ==")
            catalog = DeltaSharingCatalog(spark, Profile.from_path(profile_path))
            catalog.list_tables().show()
            catalog.sql(
                "SELECT day, count(*) AS n, sum(amount) AS total "
                "FROM sales.emea.orders WHERE id < 6 GROUP BY day ORDER BY day"
            ).show()

            print("== metadata-only aggregates (zero parquet fetched) ==")
            n_parquet_before = sum(
                1 for r in server.requests if r["path"].endswith(".parquet"))
            print("count_rows:", reader.count_rows("sales.emea.orders"))
            reader.partition_row_counts("sales.emea.orders") \
                .orderBy("day").show()
            n_parquet_after = sum(
                1 for r in server.requests if r["path"].endswith(".parquet"))
            assert n_parquet_after == n_parquet_before, \
                "metadata aggregates must not fetch data"

    spark.stop()


if __name__ == "__main__":
    main()
