"""SparkSession factory tuned for this engine (tests + bench).

The driver supplies its own session to ``__spark_entry__``; this factory is
for local tests and ``bench.py``. Settings follow the scale posture in
SURVEY.md §4: AQE on (runtime re-plan, skew-join, partition coalescing),
shuffle partitions sized to cores (not the 200 default), UTC session
timezone (duckdb-oracle comparability), Arrow enabled for the pandas/arrow
UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "datafusion-delta-sharing-spark",
              cpus: int | str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # required by the Python DataSource's pushFilters (sources/datasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # keep stdout machine-parsable: console progress bars glued onto
        # bench.py's JSON line cost round 4 its parsed artifact
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
