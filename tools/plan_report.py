"""Plan-quality report over the whole query registry: for each query, count
Exchanges, flag Cartesian products / broadcast-nested-loop joins /
row-at-a-time Python evaluation, and list scans. A cheap whole-repo audit
that catches silent plan regressions (results stay right, cost explodes).

Usage: python tools/plan_report.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# streaming queries execute eagerly on plan construction; skip them in the
# static audit (their batch plans are covered by their oracles)
_SKIP = {"stream_hourly", "stream_sliding", "stream_join", "stream_dedup",
         "stream_enrich", "sessionization", "stateful_stream",
         # format queries stage real CSV/JSON/ORC copies inside the query
         # builder — a static audit shouldn't run write jobs (their read
         # plans are plain scan+agg, covered by the oracle checks)
         "csv_scan", "json_scan", "orc_scan"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from datafusion_delta_sharing_spark.session import get_spark

    spark = get_spark("plan-report", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        if name in _SKIP or (only and name not in only):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 - report, don't abort
            report[name] = {"error": str(exc).splitlines()[0][:120]}
            continue
        row = {
            "exchanges": plan.count("+- Exchange") + plan.count("  Exchange"),
            "scans": plan.count("Scan parquet"),
        }
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("bnlj")
        if "BatchEvalPython" in plan:
            flags.append("python_row_eval")
        if "SortMergeJoin" in plan:
            flags.append("smj")
        if flags:
            row["flags"] = flags
        report[name] = row

    worst = sorted(report.items(),
                   key=lambda kv: kv[1].get("exchanges", 99), reverse=True)
    for name, row in worst:
        print(f"{name:24s} {json.dumps(row)}")
    n_err = sum("error" in r for r in report.values())
    print(f"\n{len(report)} queries audited, {n_err} errors")


if __name__ == "__main__":
    main()
