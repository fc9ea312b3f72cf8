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
    materialize_stream,
    stream_events,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total_cents bigint"


def _update_user_state(
    key: Tuple[int],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from datafusion_delta_sharing_spark.functions.money import cents_sum_np

    n, total_cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # state carries EXACT integer cents (functions/money — the one
        # half-away-from-zero recipe shared with the upsert sink and the
        # oracles; NaN/NULL values are skipped like SQL sum()): a float
        # running total re-rounded per emission drifts from the batch
        # oracle with accumulation order (r5 review)
        total_cents += cents_sum_np(pdf["value"].to_numpy(dtype="float64"))
    state.update((n, total_cents))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total_cents / 100.0],
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
    return materialize_stream(stated, "append", "stateful_stream")
