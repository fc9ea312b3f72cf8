"""Driver-simulator: run every harness query on Spark AND its DuckDB oracle,
compare row count, column set, and order-insensitive values. Strict mode
mirrors the driver's value-hash (exact equality after canonicalization);
report mode also shows near-misses to debug float drift.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datafusion_delta_sharing_spark.harness import TABLE_NAMES  # noqa: E402


def _sort_key(s: pd.Series) -> pd.Series:
    """Per-column sort key: floats order by their IEEE-754 total order
    (sign-flipped bit pattern) so -0.0 sorts strictly before 0.0.
    Without this, `sort_values` treats the two zeros as equal and the
    canonical row order of a frame containing both becomes
    input-order-dependent — which would misalign the bit-exact value
    compare on frames that are genuinely multiset-equal."""
    if pd.api.types.is_float_dtype(s):
        bits = (s.astype("float64").fillna(np.nan)
                .to_numpy(dtype="float64", copy=True).view(np.int64))
        return pd.Series(np.where(bits < 0, ~bits, bits), index=s.index)
    return s


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_float_dtype(s):
            df[col] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            # nullable Int64, not int64: a NULL in an integer column must
            # survive canonicalization (astype('int64') raises on NA and
            # killed the whole run instead of failing one query)
            df[col] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[col] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[col] = s.astype("boolean")
        else:
            df[col] = s.astype("string")
    return df.sort_values(list(df.columns), na_position="last",
                          key=_sort_key).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return [f"columns differ: spark={sorted(spark_pdf.columns)} "
                f"oracle={sorted(oracle_pdf.columns)}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} "
                        f"oracle={len(oracle_pdf)}")
        return problems
    a, b = canonical(spark_pdf), canonical(oracle_pdf)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            problems.append(f"dtype[{col}]: spark={a[col].dtype} oracle={b[col].dtype}")
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av):
            # Bit-exact compare (signed-zero-strict): the driver's
            # value-hash distinguishes -0.0 from 0.0, but pandas/numpy
            # `==` does not — which is exactly how join_salted's
            # round(sum-of-zero) passed 193/193 locally yet flaked in the
            # r5 driver window (VERDICT r5 #1). NaN bit patterns may
            # legitimately differ across engines, so NaN==NaN stays True.
            an = av.astype("float64").fillna(np.nan).to_numpy(
                dtype="float64", copy=True)
            bn = bv.astype("float64").fillna(np.nan).to_numpy(
                dtype="float64", copy=True)
            eq = pd.Series(
                (np.isnan(an) & np.isnan(bn))
                | (an.view(np.int64) == bn.view(np.int64)),
                index=av.index)
            if not eq.all():
                close = np.isclose(av.fillna(np.nan), bv.fillna(np.nan),
                                   rtol=1e-9, atol=1e-9, equal_nan=True)
                n_exact_bad = int((~eq).sum())
                n_far = int((~close).sum())
                idx = (~eq).idxmax()
                problems.append(
                    f"values[{col}]: {n_exact_bad} rows not exact "
                    f"({n_far} beyond 1e-9), e.g. row {idx}: "
                    f"spark={av[idx]!r} oracle={bv[idx]!r}")
        else:
            # fillna(False): on nullable dtypes `av == bv` yields pd.NA
            # for NULL-vs-value rows, and BooleanDtype .all() SKIPS NA —
            # a NULL on one side matched any value on the other (r5
            # review, demonstrated live)
            eq = ((av.isna() & bv.isna()) | (av == bv)).fillna(False)
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"values[{col}]: {int((~eq).sum())} rows differ, e.g. row "
                    f"{idx}: spark={av[idx]!r} oracle={bv[idx]!r}")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from datafusion_delta_sharing_spark.session import get_spark

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    unknown = only - set(queries)
    if unknown:
        # a typo'd name must not read as '0 failed' success
        sys.exit(f"unknown query name(s): {sorted(unknown)}")

    spark = get_spark("compare", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    passed, failed, rows_only = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failed.append(name)
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failed.append(name)
            print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}")
            continue
        try:
            problems = compare(name, spark_pdf, oracle_pdf)
        except Exception as exc:
            # an exotic dtype must fail THIS query, not abort the run
            failed.append(name)
            print(f"FAIL {name}: compare raised {type(exc).__name__}: {exc}")
            continue
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} rows):")
            for p in problems:
                print(f"    {p}")
        else:
            passed.append(name)
            print(f"PASS {name} ({len(spark_pdf)} rows)")

    print(f"\n{len(passed)} passed, {len(failed)} failed, "
          f"{len(rows_only)} rows-only of {len(queries)} queries")
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
