"""Profile one or more headline queries: wall time, Spark job count,
stage count, task count, and shuffle volume per run.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_query.py q1[,q2,...] [n_runs]

Per-query numbers come from the status tracker diff around the timed
region (build + noop write), so they include every action the query
function itself triggers (collects, localCheckpoints, staging writes) —
the same region bench.py times.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    names = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import __spark_entry__ as entrymod
    from datafusion_delta_sharing_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warmup identical to bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def snap():
        st = spark.sparkContext.statusTracker()
        jobs = st.getJobIdsForGroup(None)
        return set(jobs)

    for name in names:
        fn = queries[name]
        for run in range(n_runs):
            tracker = sc.statusTracker()
            before_jobs = set(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
            tracker = sc.statusTracker()
            after_jobs = set(tracker.getJobIdsForGroup(None))
            new_jobs = sorted(after_jobs - before_jobs)
            n_stages = 0
            n_tasks = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(f"{name} run{run}: total={t_total:.3f}s "
                  f"build={t_build:.3f}s jobs={len(new_jobs)} "
                  f"stages={n_stages} tasks={n_tasks}")
    spark.stop()


if __name__ == "__main__":
    main()
