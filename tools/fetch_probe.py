"""Connector fetch-path probe (VERDICT r6 #6): measure the ranged-HTTP
mapInArrow strategy against the local-parquet baseline at sf0.1 and the
10x replica, and account bytes FETCHED vs bytes PRUNED.

Every other SCALING row measures operator math on local parquet; this
probe times the same flagship-shaped scan (predicate + projection on
customer) through the real connector stack — REST listing, presigned
URLs, executor-side ranged GETs — and reads the mock server's request
log to report: how many data bytes actually moved (Range arithmetic),
how many the footer-first reader skipped, and how many FILES the
partition/stats/metadata pruners kept off the wire entirely.

Usage: python tools/fetch_probe.py [small_dir] [big_dir]
Prints one JSON line; results land in SCALING.md's "fetch path" section.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _served_bytes(requests: list[dict], sizes: dict[str, int]) -> dict:
    """Data bytes served for .parquet GETs in a request-log slice, from
    Range headers (footer-first pyarrow reads fetch small slices)."""
    total = 0
    n_gets = 0
    for r in requests:
        path = r["path"]
        if not path.endswith(".parquet") or r["method"] != "GET":
            continue
        n_gets += 1
        size = sizes.get(path, 0)
        rng = r.get("range")
        if rng and rng.startswith("bytes="):
            spec = rng[len("bytes="):]
            start_s, _, end_s = spec.partition("-")
            if start_s and end_s:
                total += int(end_s) - int(start_s) + 1
            elif start_s:
                total += max(size - int(start_s), 0)
            else:  # suffix form bytes=-N
                total += min(int(end_s), size)
        else:
            total += size
    return {"parquet_gets": n_gets, "bytes_served": total}


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"

    from pyspark.sql import functions as F

    from datafusion_delta_sharing_spark.harness import connector as C
    from datafusion_delta_sharing_spark.session import get_spark

    spark = get_spark("fetchprobe", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_runs": N, "sf_dirs": {}}

    for sf_dir in (small, big):
        if not os.path.isdir(sf_dir):
            out["sf_dirs"][sf_dir] = "absent"
            continue
        state = C._ensure_served(spark, sf_dir)
        server = state["server"]
        sizes = {p: len(b) for p, b in server.parquet_bytes.items()}
        reader = C._reader(spark, sf_dir)
        entry: dict = {}

        def timed(fn):
            samples = []
            marks = []
            for _ in range(N):
                i0 = len(server.requests)
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
                marks.append(server.requests[i0:])
            return round(statistics.median(samples), 3), marks[-1]

        # local-parquet baseline: same predicate + projection
        base = os.path.join(sf_dir, "customer.parquet")
        local_s, _ = timed(lambda: (
            spark.read.parquet(base)
            .filter(F.col("c_acctbal") >= 1000.0)
            .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")))
        entry["local_parquet_s"] = local_s

        # ranged-HTTP connector strategy (mapInArrow fetch)
        total_bytes = sum(sizes[p] for p in sizes
                          if p.startswith("/customer-")
                          and "dv" not in p)
        http_s, reqs = timed(lambda: reader.table(
            "bench.tpch.customer",
            predicate="c_acctbal >= 1000.0",
            columns=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]))
        entry["http_connector_s"] = http_s
        entry["http_overhead_x"] = round(http_s / max(local_s, 1e-9), 2)
        acct = _served_bytes(reqs, sizes)
        acct["bytes_total_share"] = total_bytes
        acct["bytes_served_frac"] = round(
            acct["bytes_served"] / max(total_bytes, 1), 3)
        entry["flagship_fetch_4of5_cols"] = acct

        # column pruning ON THE WIRE: a narrow projection must fetch
        # only its column chunks (+ the speculative footer read)
        _, nreqs = timed(lambda: reader.table(
            "bench.tpch.customer",
            columns=["c_custkey", "c_mktsegment"]))
        nacct = _served_bytes(nreqs, sizes)
        nacct["bytes_total_share"] = total_bytes
        nacct["bytes_served_frac"] = round(
            nacct["bytes_served"] / max(total_bytes, 1), 3)
        entry["narrow_fetch_2of5_cols"] = nacct

        # partition pruning: predicate on the partition column keeps
        # whole files out of the PLANNED scan. The orders share uses
        # file:// URLs that never hit the request log, so count the file
        # actions the scan actually plans (df.inputFiles()) against the
        # share's total — a pruning regression makes files_planned jump
        # to files_total (ADVICE r7: the old /query-call count was the
        # listing count regardless of pruning and could not regress)
        df = reader.table("bench.tpch.orders",
                          predicate="o_orderstatus = 'F'")
        df.write.format("noop").mode("overwrite").save()
        entry["orders_partition_pruning"] = {
            "files_total": len(server.tables[1].files),
            "files_planned": len(df.inputFiles()),
        }

        # metadata-only count: ZERO parquet bytes at any scale
        i0 = len(server.requests)
        n = reader.count_rows("bench.tpch.orders")
        meta_reqs = [r for r in server.requests[i0:]
                     if r["path"].endswith(".parquet")]
        entry["metadata_count"] = {"rows": n,
                                   "parquet_fetches": len(meta_reqs)}
        out["sf_dirs"][sf_dir] = entry

    out["loadavg"] = list(os.getloadavg())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
