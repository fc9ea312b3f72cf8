"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the Tier-B 'custom stateful operator' slot (SURVEY.md §2):
per-user running aggregates kept in explicit group state across microbatches,
driven to completion synchronously. With the whole file in one microbatch the
result equals the batch groupBy — which is exactly what the oracle checks.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datafusion_delta_sharing_spark.streaming.windows import (
    EVENTS_RAW_SCHEMA,  # noqa: F401 (re-export: tests build raw nano streams)
    materialize_stream,
    stream_events,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_state(
    key: Tuple[int],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    # state carries the UNROUNDED running total; rounding is emission-only.
    # Rounding into the state would re-round each microbatch and drift from
    # the batch-groupBy oracle as soon as the stream spans >1 batch
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [round(total, 2)],
    })


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user event count + value total with explicit state."""
    raw = stream_events(spark, sf_dir)
    stated = (
        raw.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return materialize_stream(stated, "append", "stateful")
