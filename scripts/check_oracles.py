"""Local stand-in for the driver's correctness gate: run every queries()
entry at the given sf, run its oracle_sql() in DuckDB over the same parquet
views, and compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    try:
        import pyarrow as pa

        if isinstance(result, pa.Table):
            return result.to_pandas()
    except ImportError:
        pass
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        dtype = df[col].dtype
        # pandas extension dtypes (nullable Int64/Float64 from duckdb.df()
        # or a pandas-side groupby) crash np.issubdtype — normalize them to
        # the same numpy dtypes the clean path produces: int64 when no
        # nulls, float64+NaN otherwise (the repo-wide null contract)
        if isinstance(dtype, pd.api.extensions.ExtensionDtype):
            if pd.api.types.is_integer_dtype(dtype):
                target = "int64" if not df[col].isna().any() else "float64"
                df[col] = df[col].astype(target)
            elif pd.api.types.is_float_dtype(dtype):
                df[col] = df[col].astype("float64")
            elif pd.api.types.is_bool_dtype(dtype):
                df[col] = df[col].astype(object).astype(str)
            else:
                df[col] = df[col].astype(str)
            dtype = df[col].dtype
        if dtype == object:
            df[col] = df[col].astype(str)
        elif np.issubdtype(dtype, np.floating):
            df[col] = df[col].round(9)
        elif np.issubdtype(dtype, np.integer):
            df[col] = df[col].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, log_to_driver=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{table}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: RAY ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        elapsed = time.time() - t0

        if name not in oracles:
            print(f"{name}: rows={len(mine)} cols={sorted(mine.columns)} "
                  f"({elapsed:.1f}s) [rows-only]")
            continue

        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: SQL ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
            continue

        try:
            a, b = canon(mine), canon(oracle)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: CANON ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        status = []
        if len(a) != len(b):
            status.append(f"ROWS {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            status.append(f"COLS {list(a.columns)} vs {list(b.columns)}")
        if not status:
            if not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                ndiff = int(diff.any(axis=1).sum())
                status.append(f"VALUES {ndiff} differing rows")
                bad = diff.any(axis=1)
                print(a[bad].head(3))
                print(b[bad].head(3))
        if status:
            print(f"{name}: MISMATCH {'; '.join(status)} ({elapsed:.1f}s)")
            failures.append(name)
        else:
            print(f"{name}: OK rows={len(a)} ({elapsed:.1f}s)")

    print("FAILURES:", failures or "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
