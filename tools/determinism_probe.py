"""Partitioning-determinism probe: run every harness query under several
deliberately different Spark session shapes and require the results to
match Spark-vs-Spark.

Why this exists: the oracle comparator validates Spark vs DuckDB under
ONE fixed session, but the round driver supplies its OWN session — a
query whose result depends on partitioning (a LIMIT without a total
order, a row_number tie broken by arrival order, collect_list without
sort_array, a float sum whose rounding sits on a partition-order
boundary) can pass every local validation and still flake in the
driver's window. Comparison uses the same canonicalization + exactness
rules as tools/compare_oracle.py (signed-zero-strict, bit-exact floats:
VERDICT r5 #1 showed the old float `==` let a -0.0 vs 0.0 flake
through).

Three shapes:

* ``5``  — cpus=5,  shuffle=5,  AQE partition coalescing OFF
* ``32`` — cpus=32, shuffle=32, AQE partition coalescing OFF
* ``driver`` — cpus=32, shuffle partitions left at Spark's 200 default,
  AQE coalescing ON: the shape an external harness that never tunes
  ``spark.sql.shuffle.partitions`` actually runs. The r5 `join_salted`
  flake appeared ONLY in the driver's session, so probing two tuned
  shapes and never the driver-like one left exactly that blind spot.

Coalescing stays OFF in the numbered shapes so their shuffle topologies
stay genuinely different at small SFs instead of coalescing toward
similar effective partition counts; the driver shape keeps it ON because
fidelity to the external session matters more there.

Each query gets a per-query wall-clock guard (default 600 s,
``SPARK_GRAFT_PROBE_TIMEOUT_S``): a hang under one shape cancels that
query's jobs and records an error instead of stalling the whole registry
pass (ADVICE r5).

Usage: python tools/determinism_probe.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.compare_oracle import compare  # noqa: E402

SESSION_SHAPES = ["5", "32", "driver"]
TIMEOUT_S = float(os.environ.get("SPARK_GRAFT_PROBE_TIMEOUT_S", "600"))


def _collect_with_timeout(spark, df, timeout_s: float):
    """``df.toPandas()`` bounded by a wall clock: runs the collect in a
    worker thread; on timeout cancels the job group and raises. The
    worker is tagged with a job group so only ITS jobs are cancelled."""
    import threading

    box: dict = {}
    group = f"probe-{id(df)}"

    def work():
        try:
            spark.sparkContext.setJobGroup(group, "determinism probe",
                                           interruptOnCancel=True)
            box["result"] = df.toPandas()
        except Exception as exc:  # noqa: BLE001 — re-raised by caller
            box["error"] = exc
        finally:
            spark.sparkContext.setJobGroup("", "")

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        t.join(30)
        raise TimeoutError(f"no result within {timeout_s}s (jobs cancelled)")
    if "error" in box:
        raise box["error"]
    return box["result"]


def _run_pass(shape: str, sf_dir: str, names: list[str]) -> dict:
    """One full pass over the registry in a fresh session; returns
    {name: pandas result or exception string}. The session is fully
    stopped afterwards so the next pass builds a new scheduler with a
    different task topology."""
    import __spark_entry__ as entrymod
    from datafusion_delta_sharing_spark.session import get_spark

    queries = entrymod.queries()
    if shape == "driver":
        # Spark's out-of-the-box shuffle partitioning + AQE coalescing —
        # get_spark pins shuffle partitions to cpus, so override back to
        # the 200 default an untuned external session carries
        spark = get_spark("determinism-driver", cpus=32, extra_conf={
            "spark.sql.shuffle.partitions": "200",
            "spark.sql.adaptive.coalescePartitions.enabled": "true"})
    else:
        spark = get_spark(f"determinism-{shape}", cpus=int(shape),
                          extra_conf={
            "spark.sql.adaptive.coalescePartitions.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    try:
        for name in names:
            try:
                out[name] = _collect_with_timeout(
                    spark, queries[name](spark, sf_dir), TIMEOUT_S)
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

    results = [_run_pass(shape, sf_dir, names) for shape in SESSION_SHAPES]

    passed, failed = [], []
    for name in names:
        frames = [r[name] for r in results]
        errs = [f"[{SESSION_SHAPES[i]}] {f}" for i, f in enumerate(frames)
                if isinstance(f, str)]
        if errs:
            failed.append(name)
            print(f"FAIL {name}: pass errors: {'; '.join(errs)}")
            continue
        problems = []
        for i in range(1, len(frames)):
            for p in compare(name, frames[0], frames[i]):
                problems.append(
                    f"(shape {SESSION_SHAPES[0]} vs {SESSION_SHAPES[i]}) {p}")
        if problems:
            failed.append(name)
            print(f"NONDETERMINISTIC {name}:")
            for p in problems:
                print(f"    {p}")
        else:
            passed.append(name)
            print(f"PASS {name} ({len(frames[0])} rows)")

    print(f"\n{len(passed)} deterministic, {len(failed)} nondeterministic "
          f"of {len(names)} queries")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
