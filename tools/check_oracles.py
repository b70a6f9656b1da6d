"""Driver-mimic: run every queries() entry and compare to its oracle_sql().

Usage: python tools/check_oracles.py [sf_dir] [name ...]
Mirrors the driver's CORRECTNESS check: row count + schema + order-
insensitive value comparison (exact for ints/strings, tolerant 1e-9 for
floats).  Entries without SQL get a rows-only smoke check.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"schema {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                bad = np.flatnonzero(~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9))
                return f"float col {c}: {len(bad)} diffs, first {bad[:3]} {av[bad[:3]]} vs {bv[bad[:3]]}"
        else:
            if not (av == bv).all():
                bad = np.flatnonzero(av != bv)
                return f"col {c}: {len(bad)} diffs, first {bad[:3]}: {av[bad[:3]]} vs {bv[bad[:3]]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, ".")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: engine raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in sqls:
            theirs = normalize(con.sql(sqls[name]).df())
            err = compare(ours, theirs)
            if err:
                print(f"FAIL  {name} ({dt:.1f}s): {err}")
                failures += 1
            else:
                print(f"OK    {name} ({dt:.1f}s): {len(ours)} rows == oracle")
        else:
            print(f"ROWS  {name} ({dt:.1f}s): {len(ours)} rows (no SQL oracle)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
