"""Strictness tests for the local oracle comparator + a rotating
registry sample run against DuckDB inside pytest.

Motivation (VERDICT r5 #1 / task #4): the r5 driver window flagged
`join_salted` as a hash mismatch while 193/193 local validation, the
determinism probe, and five judge reruns all passed — because the local
float comparison used pandas `==`, where `-0.0 == 0.0` is True, but the
driver's value-hash distinguishes signed zeros. The comparator is now
bit-exact on floats; these tests pin that the OLD failure class is
locally visible, and a rotating 20-query oracle sample keeps stale
provenance rows (r1/r2-attested queries) continuously verified instead
of round-sampled (VERDICT r5 task #7).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.compare_oracle import compare  # noqa: E402


# -- signed-zero / bit-exact float strictness ------------------------------


def test_compare_flags_signed_zero_mismatch():
    """The exact shape that flaked in the r5 driver window: a rounded
    residual-of-zero sum emitting -0.0 on one engine and 0.0 on the
    other. Must FAIL locally now."""
    a = pd.DataFrame({"k": ["x", "y"], "sum_dev": [0.0, -0.0]})
    b = pd.DataFrame({"k": ["x", "y"], "sum_dev": [0.0, 0.0]})
    problems = compare("old_join_salted", a, b)
    assert problems, "-0.0 vs 0.0 must be a comparator failure"
    assert any("sum_dev" in p for p in problems)


def test_compare_accepts_bit_identical_floats_and_nans():
    a = pd.DataFrame({"v": [1.5, -0.0, np.nan, 3.14]})
    b = pd.DataFrame({"v": [1.5, -0.0, np.nan, 3.14]})
    assert compare("same", a, b) == []


def test_compare_flags_float_null_vs_value():
    a = pd.DataFrame({"v": [1.0, None]}, dtype="float64")
    b = pd.DataFrame({"v": [1.0, 2.0]})
    assert compare("null_vs_value", a, b)


def test_compare_aligns_multiset_equal_mixed_zeros():
    """Bit-exact comparison must not FALSE-POSITIVE on frames that are
    multiset-equal but carry both zeros in different input order — the
    canonical sort orders floats by IEEE-754 total order (-0.0 < 0.0),
    so genuinely equal frames align and genuinely different ones don't."""
    a = pd.DataFrame({"k": [1, 1], "v": [0.0, -0.0]})
    b = pd.DataFrame({"k": [1, 1], "v": [-0.0, 0.0]})
    assert compare("multiset_equal", a, b) == []
    c = pd.DataFrame({"k": [1, 1], "v": [0.0, 0.0]})
    assert compare("multiset_diff", a, c)


def test_compare_nan_null_order_stable():
    a = pd.DataFrame({"v": [np.nan, 1.0, -0.0]})
    b = pd.DataFrame({"v": [-0.0, np.nan, 1.0]})
    assert compare("nan_order", a, b) == []


def test_compare_flags_last_bit_difference():
    x = 0.1 + 0.2          # 0.30000000000000004
    a = pd.DataFrame({"v": [x]})
    b = pd.DataFrame({"v": [0.3]})
    assert compare("ulp", a, b), "bit-exact means ULP differences fail"


# -- salted join determinism ------------------------------------------------


def test_salted_join_salt_is_content_deterministic(spark):
    """The salt must be a pure function of row content (VERDICT r5 #1):
    repartitioning the input must not change any row's salt assignment."""
    from datafusion_delta_sharing_spark.operators import skew

    rows = [(i, i % 3, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, k long, value double")
    dim = df.groupBy("k").count().select("k")

    from pyspark.sql import functions as F

    def salt_map(frame):
        # same expression salted_join builds with salt_on=['event_id']
        salted = frame.withColumn(
            skew.SALT_COL,
            F.pmod(F.xxhash64(F.lit("salt"), frame.event_id), F.lit(16)))
        return {r.event_id: r[skew.SALT_COL] for r in salted.collect()}

    # exercise the public API end-to-end too: identical results across
    # two very different input layouts
    out1 = skew.salted_join(df, dim, on="k", salts=16,
                            salt_on=["event_id"]).collect()
    out2 = skew.salted_join(df.repartition(17, "value"), dim, on="k",
                            salts=16, salt_on=["event_id"]).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert salt_map(df) == salt_map(df.repartition(29, "k"))


def test_salted_join_rejects_unknown_salt_on(spark):
    from datafusion_delta_sharing_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, 2)], "k long, v long")
    b = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="salt_on"):
        salted_join(a, b, "k", salt_on=["nope"])


# -- rotating oracle sample (VERDICT r5 task #7) ----------------------------


def _rotation_seed() -> int:
    """Rotates once per driver round: the round artifacts accumulate one
    CORRECTNESS_r*.json per round, so their count is a stable-within-a-
    round, advancing-across-rounds seed (no wall clock involved)."""
    return len(list(REPO.glob("CORRECTNESS_r*.json")))


def test_rotating_oracle_sample(spark):
    """Run a deterministic 20-query slice of the registry against the
    DuckDB oracle at sf0.001 with the strict (signed-zero-exact)
    comparator. Over ~10 rounds the rotation covers the whole registry,
    keeping r1/r2-provenance rows continuously verified."""
    import duckdb

    import __spark_entry__ as entrymod
    from datafusion_delta_sharing_spark.harness import TABLE_NAMES

    sf_dir = "/root/testdata/sf0.001"
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(n for n in queries if n in oracles)
    k = 20
    start = (_rotation_seed() * k) % len(names)
    sample = [names[(start + i) % len(names)] for i in range(k)]

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    failures = []
    for name in sample:
        spark_pdf = queries[name](spark, sf_dir).toPandas()
        oracle_pdf = con.execute(oracles[name]).fetchdf()
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures.append((name, problems))
    con.close()
    assert not failures, f"oracle sample failures: {failures}"
