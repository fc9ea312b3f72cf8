"""Rotating strict-oracle sample (VERDICT r6 #7, carried from r5 #7):
every pytest run pushes a deterministic 18-query slice of the registry
through the SAME strict comparator the driver simulator uses
(tools/compare_oracle.canonical/compare — bit-exact floats, signed-zero
strict), at sf0.001, so oldest-driver-row drift surfaces in every test
run instead of once per judge round.

Rotation key = the number of CORRECTNESS_r*.json artifacts in the repo
root — it increments exactly once per driver round, so the slice is
DETERMINISTIC within a round (no flaky day-based keys) and advances
between rounds; with 18 per round the wrap covers the full ~228-query
registry in ~13 rounds.
"""

from __future__ import annotations

import glob
import pathlib
import sys

import duckdb
import pytest

_REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from tools.compare_oracle import compare  # noqa: E402

_SLICE = 18


def _rotation_slice(names: list[str], round_no: int) -> list[str]:
    """Wrap-around slice [round_no*_SLICE, +_SLICE) over sorted names."""
    n = len(names)
    start = (round_no * _SLICE) % n
    doubled = names + names
    return doubled[start:start + _SLICE]


def test_rotation_covers_registry_within_13_rounds():
    names = [f"q{i}" for i in range(228)]
    seen: set[str] = set()
    for rnd in range(13):
        seen.update(_rotation_slice(names, rnd))
    assert seen == set(names)


def test_rotating_oracle_slice(spark, sf_dir):
    import __spark_entry__ as entry
    from datafusion_delta_sharing_spark.harness import TABLE_NAMES

    queries, oracles = entry.queries(), entry.oracle_sql()
    round_no = len(glob.glob(str(_REPO / "CORRECTNESS_r*.json")))
    slice_names = _rotation_slice(sorted(queries), round_no)

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    failures = []
    for name in slice_names:
        sql = oracles.get(name)
        if sql is None:  # rows-only by design — nothing to compare here
            continue
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            oracle_pdf = con.execute(sql).fetchdf()
            problems = compare(name, spark_pdf, oracle_pdf)
        except Exception as exc:  # a raise is a failure, not an error
            problems = [f"raised {type(exc).__name__}: {exc}"]
        if problems:
            failures.append((name, problems))
    assert not failures, (
        f"rotating oracle slice (round key {round_no}) failed: {failures}")
