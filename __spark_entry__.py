"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (projection + filter + limit, the
reference's examples/query_from_catalog.rs:21 shape) on sf0.001.
``queries()``/``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 (Tier-B relational surface + LLM-pipeline extensions), each
checked against a DuckDB oracle at sf0.01 where ANSI-SQL expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datafusion_delta_sharing_spark.harness.tierb import q_flagship

    return q_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datafusion_delta_sharing_spark.harness import (
        connector, extensions, tierb, tierb2, tierb3, tierb4, tierb5, tpch,
    )

    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # connector first: these exercise the Delta Sharing read stack itself
    # (mock server + format('deltasharing')) and must stay on the oracle path
    for mod in (connector, tierb, tierb2, tierb3, tierb4, tierb5, tpch,
                extensions):
        registry.update(mod.QUERIES)
    return registry


def oracle_sql() -> dict[str, str]:
    from datafusion_delta_sharing_spark.harness import (
        connector, extensions, tierb, tierb2, tierb3, tierb4, tierb5, tpch,
    )

    oracles: dict[str, str] = {}
    for mod in (connector, tierb, tierb2, tierb3, tierb4, tierb5, tpch,
                extensions):
        oracles.update(mod.ORACLES)
    return oracles
