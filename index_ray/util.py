"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import ray


def pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster's CPUs."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return (1, max(2, cpus))


def pairs_table(ds, extra_cols: tuple[str, ...] = ()) -> pa.Table:
    """Collect a (a, b[, ...]) pair dataset -> unique sorted Arrow table."""
    import pandas as pd

    cols = ["a", "b", *extra_cols]
    df = ds.to_pandas()
    if len(df) == 0:
        df = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    df = df.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[cols], preserve_index=False)
