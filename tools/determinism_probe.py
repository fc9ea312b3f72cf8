"""Partitioning-determinism probe: run every harness query under two
deliberately different Spark session shapes (parallelism + shuffle
partition count) and require the results to match Spark-vs-Spark.

Why this exists: the oracle comparator validates Spark vs DuckDB under
ONE fixed session, but the round driver supplies its OWN session — a
query whose result depends on partitioning (a LIMIT without a total
order, a row_number tie broken by arrival order, collect_list without
sort_array, a float sum whose rounding sits on a partition-order
boundary) can pass every local validation and still flake in the
driver's window. This probe runs the registry at cpus=5/shuffle=5 and
cpus=32/shuffle=32 — different partition counts, different merge orders,
different task scheduling — and compares with the same canonicalization
+ exactness rules as tools/compare_oracle.py (signed-zero-strict,
bit-exact floats: VERDICT r5 #1 showed the old float `==` let a -0.0 vs
0.0 flake through). AQE partition coalescing is disabled in both probe
sessions so the two shuffle topologies stay genuinely different at small
SFs instead of coalescing toward similar effective partition counts.

Usage: python tools/determinism_probe.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.compare_oracle import compare  # noqa: E402

SESSION_SHAPES = [5, 32]  # cpus == shuffle partitions per pass


def _run_pass(cpus: int, sf_dir: str, names: list[str]) -> dict:
    """One full pass over the registry in a fresh session; returns
    {name: pandas result or exception string}. The session is fully
    stopped afterwards so the next pass builds a new scheduler with a
    different task topology."""
    import __spark_entry__ as entrymod
    from datafusion_delta_sharing_spark.session import get_spark

    queries = entrymod.queries()
    spark = get_spark(f"determinism-{cpus}", cpus=cpus, extra_conf={
        "spark.sql.adaptive.coalescePartitions.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    try:
        for name in names:
            try:
                out[name] = queries[name](spark, sf_dir).toPandas()
            except Exception as exc:  # noqa: BLE001 — recorded, not fatal
                out[name] = f"raised {type(exc).__name__}: {exc}"
    finally:
        spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    names = [n for n in entrymod.queries() if not only or n in only]
    unknown = only - set(names)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}")

    results = [_run_pass(cpus, sf_dir, names) for cpus in SESSION_SHAPES]

    passed, failed = [], []
    for name in names:
        a, b = results[0][name], results[1][name]
        if isinstance(a, str) or isinstance(b, str):
            failed.append(name)
            print(f"FAIL {name}: pass errors: {a if isinstance(a, str) else ''}"
                  f" {b if isinstance(b, str) else ''}")
            continue
        problems = compare(name, a, b)
        if problems:
            failed.append(name)
            print(f"NONDETERMINISTIC {name} "
                  f"(shapes {SESSION_SHAPES[0]} vs {SESSION_SHAPES[1]}):")
            for p in problems:
                print(f"    {p}")
        else:
            passed.append(name)
            print(f"PASS {name} ({len(a)} rows)")

    print(f"\n{len(passed)} deterministic, {len(failed)} nondeterministic "
          f"of {len(names)} queries")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
