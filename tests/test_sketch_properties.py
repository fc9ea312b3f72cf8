"""Hypothesis property tests for the sketch layer (no Spark session —
the partition-level functions are exercised directly, so hundreds of
cases run in seconds).

The load-bearing claim behind ``heavy_hitters`` being EXACT despite the
bounded-state pass: for any data, any partitioning, and any capacity c,
the union of per-partition Misra-Gries survivors contains every value
with global frequency > n/(c+1). These tests attack that claim with
adversarial orderings, skew, and partition boundaries chosen by the
fuzzer."""

from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_delta_sharing_spark.operators.sketches import (
    _misra_gries_partition,
)


def _survivors(values, capacity, batch_size):
    run = _misra_gries_partition("v", capacity)
    batches = [pd.DataFrame({"v": values[i:i + batch_size]})
               for i in range(0, len(values), batch_size)] or \
        [pd.DataFrame({"v": []})]
    (out,) = list(run(iter(batches)))
    # the pass emits one count row per partition (v NULL, _n_part set);
    # survivors are the candidate rows only — and the count must be right
    assert out["_n_part"].dropna().sum() == len(values)
    return set(out[out["_n_part"].isna()]["v"])


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(st.integers(min_value=0, max_value=20), max_size=400),
    capacity=st.integers(min_value=1, max_value=10),
    batch_size=st.integers(min_value=1, max_value=50),
)
def test_misra_gries_superset_guarantee(values, capacity, batch_size):
    """Every value with frequency > n/(capacity+1) survives the pass,
    whatever the batch boundaries."""
    vals = [str(v) for v in values]
    survivors = _survivors(vals, capacity, batch_size)
    counts = Counter(vals)
    n = len(vals)
    must_survive = {v for v, c in counts.items()
                    if c > n / (capacity + 1)}
    assert must_survive <= survivors
    # and the state bound held: never more than capacity survivors
    assert len(survivors) <= capacity or not vals


@settings(max_examples=100, deadline=None)
@given(
    partitions=st.lists(
        st.lists(st.integers(min_value=0, max_value=10), max_size=100),
        min_size=1, max_size=6),
    capacity=st.integers(min_value=2, max_value=8),
)
def test_misra_gries_distributed_pigeonhole(partitions, capacity):
    """The distributed form: the UNION of per-partition survivors
    contains every value with GLOBAL frequency > n/(capacity+1) —
    the pigeonhole step heavy_hitters relies on before its exact
    recount."""
    union = set()
    for part in partitions:
        union |= _survivors([str(v) for v in part], capacity, 13)
    allv = [str(v) for part in partitions for v in part]
    counts, n = Counter(allv), len(allv)
    heavy = {v for v, c in counts.items() if c > n / (capacity + 1)}
    assert heavy <= union
