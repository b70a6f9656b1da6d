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


def pairs_table(ds, extra_cols: tuple[str, ...] = ()) -> pa.Table:
    """Collect a (a, b[, ...]) pair dataset -> unique sorted Arrow table."""
    import pandas as pd

    cols = ["a", "b", *extra_cols]
    df = ds.to_pandas()
    if len(df) == 0:
        df = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    df = df.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[cols], preserve_index=False)


_STAGE_CACHE: dict = {}


def stage_fn(cls, *args):
    """Wrap a callable stage class for task-based ``map_batches``.

    Dataset actor pools (``map_batches(Cls, concurrency=...)``) spawn fresh
    processes, and on this host class a new process re-pays its arena's
    first-touch page faults — measured 7-20x the whole stage cost for
    cheap-init stages (one compiled regex, a broadcast ref).  Plain tasks
    reuse Ray's warm worker processes; this wrapper keeps the
    init-once-per-process semantics by caching the instance in a module
    global resolved inside the worker (the closure itself is re-pickled per
    task, so the cache must live in the imported module, not the closure).

    Use for stages whose ``__init__`` is cheap and deterministic in
    ``args``; keep true actor pools for expensive state (loaded shards,
    trained quantizers).  ``args`` must be hashable (ObjectRefs are).
    """
    key = (cls.__module__, cls.__qualname__)

    def fn(batch):
        from index_ray.util import _STAGE_CACHE

        cached = _STAGE_CACHE.get(key)
        if cached is None or cached[0] != args:
            cached = (args, cls(*args))
            _STAGE_CACHE[key] = cached
        return cached[1](batch)

    return fn


def hash_groupby(
    ds,
    keys: list[str],
    finalize,
    num_partitions: int | None = None,
):
    """groupby-aggregate via ONE hash-shuffle repartition + a per-partition
    Arrow finalize — the pattern the index build's shuffle/pack uses.

    Ray Data's ``groupby().aggregate()`` is sort-based (a full range sort
    of the keyed rows); when group keys barely collapse (cardinality ~
    rows), the sort dominates.  ``repartition(keys=...)`` under the
    HASH_SHUFFLE strategy co-locates equal keys without sorting, and
    ``finalize`` (pa.Table -> pa.Table) sees each partition whole, so a
    plain ``pa.Table.group_by`` inside it is exact.  ``keys`` may be a
    PREFIX of the true group key (e.g. user_id for (user_id, window)) —
    anything the prefix determines lands in one partition.
    """
    from ray.data.context import ShuffleStrategy

    if num_partitions is None:
        # each partition becomes a hash-shuffle aggregator actor; for the
        # row volumes these analytic aggregates see, actor spawn overhead
        # beats parallelism past ~cpus/2 (measured: 8 parts 2.1s, 128 parts
        # 5.8s on the same 100k-row input) — callers with huge inputs pass
        # their own count
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    # each Dataset chain carries its own DataContext copy — flip the
    # strategy on THIS chain only (the flag is read at execution time, so
    # a save/restore around plan construction would not survive laziness)
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds.repartition(num_partitions, keys=keys, sort=False).map_batches(
        finalize, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
