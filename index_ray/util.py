"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import ray


def retain_malloc_pages(threshold: int = 1 << 30) -> None:
    """Keep freed heap pages in-process (glibc ``mallopt``).

    This class of host provisions fresh pages far slower than it recycles
    them, so a worker that mmap/munmap-churns its large numpy temporaries
    re-pays the first-touch cost on every task.  Raising the mmap and trim
    thresholds keeps the arena resident after the first task warms it —
    the runtime equivalent of the ``MALLOC_MMAP_THRESHOLD_`` env var, for
    workers whose environment the driver doesn't control."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-1, threshold)  # M_TRIM_THRESHOLD
        libc.mallopt(-3, threshold)  # M_MMAP_THRESHOLD
    except Exception:
        pass  # non-glibc platform: harmless no-op


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
