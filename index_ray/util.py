"""Small shared helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


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


def _bucket_of(t: pa.Table, keys: list[str], nparts: int) -> np.ndarray:
    """Vectorized per-row bucket ids from the key columns (any dtype)."""
    import pandas as pd

    h = np.zeros(t.num_rows, dtype=np.uint64)
    for k in keys:
        col = t[k].to_numpy(zero_copy_only=False)
        h = h * np.uint64(1000003) ^ pd.util.hash_array(col)
    return (h % np.uint64(nparts)).astype(np.int64)


@ray.remote
def _hg_split(block, keys: list[str], nparts: int):
    """Map side: split one upstream block into ``nparts`` bucket tables.

    Returned via ``num_returns`` fan-out so each bucket's rows become their
    own object — a reduce task pulls only its bucket, never the whole block.
    Buckets a block doesn't touch come back as 0-row tables (keeps the
    reduce-side schema known even for empty buckets)."""
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    if t.num_rows == 0:
        # a 0-row block may be schema-less (Ray Data's map_batches emits
        # column-less empties for empty inputs) — fan it out as-is; the
        # reduce side drops 0-row parts whenever any live part exists
        return tuple(t for _ in range(nparts)) if nparts > 1 else t
    b = _bucket_of(t, keys, nparts)
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nparts + 1))
    # per-bucket take (not slice-of-sorted): take materializes compact
    # buffers, so each return object holds only its own rows
    out = tuple(t.take(order[bounds[i] : bounds[i + 1]]) for i in range(nparts))
    return out if nparts > 1 else out[0]


@ray.remote
def _hg_reduce(finalize, *parts: pa.Table) -> pa.Table:
    """Reduce side: a bucket holds EVERY row of its keys -> the plain Arrow
    ``finalize`` (pa.Table -> pa.Table) is exact."""
    live = [p for p in parts if p.num_rows]
    if live:
        t = pa.concat_tables(live, promote_options="default")
    else:
        # all-empty bucket: prefer a part that still carries the schema
        # (schema-less empties exist — see _hg_split's 0-row fast path)
        t = max(parts, key=lambda p: p.num_columns)
    return finalize(t)


@ray.remote
def _block_sum(block, val_col: str) -> tuple[int, int]:
    """(rows, sum) — rows lets the driver drop 0-row blocks, which Ray Data
    can emit column-less (no ``val_col`` to scan)."""
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    if t.num_rows == 0:
        return 0, 0
    import pyarrow.compute as pc

    return t.num_rows, int(pc.sum(t[val_col]).as_py() or 0)


@ray.remote
def _block_scan(block, val_col: str, out_col: str, offset: int) -> pa.Table:
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
    run = np.cumsum(v) - v + offset  # exclusive within-block prefix + offset
    return t.append_column(out_col, pa.array(run, pa.int64()))


@ray.remote
def _block_rownum(
    block, out_col: str, offset: int, total: int, ntiles: int | None, tile_col: str
) -> pa.Table:
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    rn = offset + np.arange(1, t.num_rows + 1, dtype=np.int64)
    t = t.append_column(out_col, pa.array(rn, pa.int64()))
    if ntiles:
        # SQL-exact ntile: the first (total % b) tiles hold ceil(total/b)
        # rows, the rest floor(total/b)
        small, r = divmod(total, ntiles)
        big = small + 1
        boundary = r * big
        tile = np.where(
            rn <= boundary,
            (rn - 1) // big + 1,
            r + (rn - boundary - 1) // max(small, 1) + 1,
        ).astype(np.int64)
        t = t.append_column(tile_col, pa.array(tile, pa.int64()))
    return t


def global_row_number(
    ds,
    sort_cols: list[str],
    descending: list[bool],
    out_col: str = "rn",
    ntiles: int | None = None,
    tile_col: str = "tile",
):
    """``row_number() OVER (ORDER BY ...)`` — optionally plus ``ntile(b)``
    over the same ordering — as a distributed window primitive.

    Phase 0 is the range sort (the only all-to-all; Ray Data's sort yields
    globally ordered blocks).  Phase 1 reads ONE integer per block (its
    row count); the driver cumsums that tiny vector into exclusive
    offsets.  Phase 2 rewrites each block independently: rank = offset +
    local index, and the SQL-exact ntile falls out of (rank, total)
    arithmetic.  Same two-narrow-pass shape as ``ordered_prefix_sum``;
    driver state is one int per block — window-over-sort-scale-safe.
    ``sort_cols`` must be a total order (include a unique tiebreak column)
    for the result to be deterministic.
    """
    ds = ds.sort(sort_cols, descending=descending)
    blocks = [
        b
        for bundle in ds.iter_internal_ref_bundles()
        for b in bundle.block_refs
    ]
    counts = ray.get([_block_rows.remote(b) for b in blocks]) if blocks else []
    live = [(b, c) for b, c in zip(blocks, counts) if c]
    if not live:
        empty = pa.table(
            {"__none__": pa.array([], pa.int64())}
        ).drop_columns(["__none__"])
        return ray.data.from_arrow(empty)
    cs = np.array([c for _, c in live], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(cs)[:-1]])
    total = int(cs.sum())
    return ray.data.from_arrow_refs(
        [
            _block_rownum.remote(b, out_col, int(o), total, ntiles, tile_col)
            for (b, _), o in zip(live, offs)
        ]
    )


@ray.remote
def _block_rows(block) -> int:
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    return t.num_rows


def ordered_prefix_sum(ds, key: str, val_col: str, out_col: str):
    """EXCLUSIVE prefix sum of ``val_col`` over ``ds`` ordered by ``key`` —
    the classic two-phase distributed scan.

    Phase 0 is ``ds.sort(key)`` (the only all-to-all; Ray Data's range
    sort yields globally ordered blocks).  Phase 1 reads one integer per
    block (its sum); the driver cumsums that tiny vector into exclusive
    block offsets.  Phase 2 rewrites each block independently with its
    within-block cumsum plus the offset.  Work is two narrow passes over
    the blocks; driver state is one int per block — scan-scale-safe.
    """
    ds = ds.sort(key)
    blocks = [
        b
        for bundle in ds.iter_internal_ref_bundles()
        for b in bundle.block_refs
    ]
    if not blocks:
        return ds
    stats = ray.get([_block_sum.remote(b, val_col) for b in blocks])
    live = [(b, s) for b, (rows, s) in zip(blocks, stats) if rows]
    if not live:
        empty = pa.table(
            {"__none__": pa.array([], pa.int64())}
        ).drop_columns(["__none__"])
        return ray.data.from_arrow(empty)
    sums = [s for _, s in live]
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]])
    return ray.data.from_arrow_refs(
        [
            _block_scan.remote(b, val_col, out_col, int(o))
            for (b, _), o in zip(live, offs)
        ]
    )


def hash_groupby(
    ds,
    keys: list[str],
    finalize,
    num_partitions: int | None = None,
):
    """groupby-aggregate via ONE task-based bucket shuffle + a per-bucket
    Arrow finalize — the same map-side fan-out pattern the index build's
    shuffle/pack uses (``build.py``), generalized.

    Ray Data's ``groupby().aggregate()`` is sort-based (a full range sort
    of the keyed rows); when group keys barely collapse (cardinality ~
    rows), the sort dominates.  Its HASH_SHUFFLE repartition co-locates
    keys without sorting but spawns a fresh aggregator-actor pool per
    execution — on this host class a new process re-pays its arena's
    first-touch page faults, which made a cold-session call ~4x slower
    than the same call warm.  Plain tasks reuse Ray's warm workers, so:

      split task per upstream block -> ``num_returns`` bucket fan-out ->
      one reduce task per bucket (concat + ``finalize``).

    Data movement is identical to a hash shuffle (each row crosses the
    object store once on each side); ``keys`` may be a PREFIX of the true
    group key (e.g. user_id for (user_id, window)) — anything the prefix
    determines lands in one bucket.  The driver only brokers ObjectRefs
    (blocks x buckets of them); callers shuffling very wide inputs should
    keep ``num_partitions`` moderate and rely on larger upstream blocks —
    ref bookkeeping, not data, is the driver-side cost.
    """
    if num_partitions is None:
        # one reduce task per bucket; past ~cpus/2 the extra buckets only
        # add scheduling overhead at these row volumes (callers with huge
        # inputs pass their own count)
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
    nparts = num_partitions
    per_block: list = []
    for bundle in ds.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            if nparts > 1:
                per_block.append(
                    _hg_split.options(num_returns=nparts).remote(bref, keys, nparts)
                )
            else:
                per_block.append((_hg_split.remote(bref, keys, nparts),))
    if not per_block:
        # empty upstream: finalize an empty projection driver-side
        try:
            empty = pa.schema(ds.schema().base_schema).empty_table()
        except Exception:
            empty = pa.table({})
        return ray.data.from_arrow(finalize(empty))
    out = [
        _hg_reduce.remote(finalize, *[pb[p] for pb in per_block])
        for p in range(nparts)
    ]
    return ray.data.from_arrow_refs(out)


# ----------------------------------------- bounded candidate-pair tiles ----

MAX_TILE = 512  # pairwise-candidate tile edge (memory bound, not a cap)

_EMPTY_TILES = pa.table(
    {
        "a_ids": pa.array([], pa.binary()),
        "b_ids": pa.array([], pa.binary()),
        "diag": pa.array([], pa.bool_()),
    }
)


def _tiles_in_bucket(
    t: pa.Table, key_cols: list[str], id_col: str = "doc_id", side_fn=None
) -> pa.Table:
    """One hash bucket of (key..., id) rows -> TILE DESCRIPTOR rows
    instead of raw O(g^2) candidate pairs per key group: each group's
    member ids (sorted unique) split into MAX_TILE-sized chunks; each
    (i <= j) chunk pair becomes ONE row (a_ids blob, b_ids blob, diag).
    A hot group the upstream filter failed to prune therefore emits
    O(g^2 / MAX_TILE) BYTES from this call — never O(g^2) rows in one
    worker heap; ``_expand_tiles`` downstream turns each descriptor into
    at most MAX_TILE^2 pairs per small batch.

    ``side_fn(ids) -> (left, right)`` turns the within-group triu into a
    two-sided cross product (e.g. train x eval decontamination); with it,
    every tile is off-diagonal (full cross)."""
    if t.num_rows == 0 or id_col not in t.column_names:
        return _EMPTY_TILES
    ids = t[id_col].to_numpy(zero_copy_only=False)
    keys = [t[k].to_numpy(zero_copy_only=False) for k in key_cols]
    order = np.lexsort(tuple([ids] + keys[::-1]))
    ids = ids[order]
    keys = [k[order] for k in keys]

    def _same_key(arrs: list, n: int) -> np.ndarray:
        same = np.ones(max(n - 1, 0), dtype=bool)
        for k in arrs:
            same &= k[1:] == k[:-1]
        return same

    # distinct (key, id), then group boundaries on the FILTERED arrays
    same = _same_key(keys, len(ids))
    keep = np.concatenate([[True], ~(same & (ids[1:] == ids[:-1]))])
    ids = ids[keep]
    keys = [k[keep] for k in keys]
    same = _same_key(keys, len(ids))
    starts = np.flatnonzero(np.concatenate([[True], ~same]))
    ends = np.append(starts[1:], len(ids))
    a_blobs, b_blobs, diag = [], [], []

    def emit_cross(L: np.ndarray, R: np.ndarray) -> None:
        for i in range(0, len(L), MAX_TILE):
            for j in range(0, len(R), MAX_TILE):
                a_blobs.append(L[i : i + MAX_TILE].astype(np.int64).tobytes())
                b_blobs.append(R[j : j + MAX_TILE].astype(np.int64).tobytes())
                diag.append(False)

    for s, e in zip(starts, ends):
        members = ids[s:e]
        if side_fn is not None:
            left, right = side_fn(members)
            if len(left) and len(right):
                emit_cross(left, right)
            continue
        g = e - s
        if g < 2:
            continue
        if g > MAX_TILE:
            import logging

            logging.getLogger(__name__).warning(
                "candidate bucket with %d members (> %d) — tiled emit "
                "(at scale an oversized bucket signals a key needing a "
                "secondary salt, never silent loss)",
                g, MAX_TILE,
            )
        chunks = [
            members[i : i + MAX_TILE].astype(np.int64)
            for i in range(0, g, MAX_TILE)
        ]
        for i in range(len(chunks)):
            for j in range(i, len(chunks)):
                a_blobs.append(chunks[i].tobytes())
                b_blobs.append(chunks[j].tobytes())
                diag.append(i == j)
    return pa.table(
        {
            "a_ids": pa.array(a_blobs, pa.binary()),
            "b_ids": pa.array(b_blobs, pa.binary()),
            "diag": pa.array(diag, pa.bool_()),
        }
    )


def _expand_tiles(batch: pa.Table) -> pa.Table:
    """Tile descriptors -> candidate (a, b) pairs, bounded per call by
    batch_size x MAX_TILE^2 rows.  Ids within a tile row are ascending
    and chunks are disjoint ascending, so a < b by construction for
    triu/diag tiles (two-sided cross tiles carry arbitrary sides)."""
    a_parts, b_parts = [], []
    for a_blob, b_blob, dg in zip(
        batch["a_ids"].to_pylist(),
        batch["b_ids"].to_pylist(),
        batch["diag"].to_pylist(),
    ):
        A = np.frombuffer(a_blob, dtype=np.int64)
        if dg:
            ii, jj = np.triu_indices(len(A), k=1)
            a_parts.append(A[ii])
            b_parts.append(A[jj])
        else:
            B = np.frombuffer(b_blob, dtype=np.int64)
            a_parts.append(np.repeat(A, len(B)))
            b_parts.append(np.tile(B, len(A)))
    if not a_parts:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "a": pa.array(np.concatenate(a_parts), pa.int64()),
            "b": pa.array(np.concatenate(b_parts), pa.int64()),
        }
    )


def bounded_pair_dataset(
    ds, key_cols: list[str], id_col: str = "doc_id", side_fn=None,
    expand_batch: int = 4,
):
    """Per-key-group candidate pairs as a DATASET with bounded per-task
    memory: ONE hash shuffle on ``key_cols`` -> tile descriptors ->
    small-batch expansion.  Each group's pairs are emitted exactly once
    (so multiplicity across groups — e.g. shared-gram counts — is
    preserved); a downstream consumer that wants distinct pairs dedups in
    its own shuffle."""
    import functools

    fin = functools.partial(_tiles_in_bucket, key_cols=key_cols,
                            id_col=id_col, side_fn=side_fn)
    return hash_groupby(ds, keys=key_cols, finalize=fin).map_batches(
        _expand_tiles, batch_format="pyarrow", batch_size=expand_batch
    )


def _identity_table(t: pa.Table) -> pa.Table:
    return t


def hash_partition_refs(ds, key_cols: list[str], n_parts: int) -> tuple:
    """Split a dataset into ``n_parts`` hash partitions held as
    ObjectRefs — the lookup side of a blocked tile verify.  Partition
    assignment uses the same pandas hash as ``_bucket_of`` /
    ``tag_pair_tiles``, so a pair tagged with its partitions lands with
    exactly the partitions that hold its two rows."""
    blocks = [
        b for bundle in ds.iter_internal_ref_bundles() for b in bundle.block_refs
    ]
    if not blocks:
        # zero-block dataset: every partition is an empty column-less
        # table (consumers' lookup builders run only for non-empty tile
        # groups, which cannot exist without rows)
        empty = ray.put(pa.table({}))
        return tuple(empty for _ in range(n_parts))
    per_block = [
        _hg_split.options(num_returns=n_parts).remote(b, key_cols, n_parts)
        for b in blocks
    ]
    refs = tuple(
        _hg_reduce.remote(_identity_table, *[pb[p] for pb in per_block])
        for p in range(n_parts)
    )
    # Barrier WITHOUT fetching: the refs are consumed via ray.get inside
    # downstream shuffle-reduce tasks, and submitting that shuffle while
    # these producers are still pending can stall for minutes (the
    # consumers occupy the worker slots and block on the nested get while
    # the producers wait to schedule — measured ~510 s on this host).
    # Waiting here costs the producers' runtime once, driver-side, with
    # no data movement.
    ray.wait(list(refs), num_returns=len(refs), fetch_local=False)
    return refs


VERIFY_PARTS = 16  # default partition count for blocked tile verifies


def tag_pair_tiles(t: pa.Table, n_parts: int) -> pa.Table:
    """Tag each candidate pair with its (partition-of-a, partition-of-b)
    tile key — the hash must match :func:`hash_partition_refs`."""
    import pandas as pd

    if t.num_rows == 0 or "a" not in t.column_names:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "pb_a": pa.array([], pa.int64()),
                "pb_b": pa.array([], pa.int64()),
            }
        )
    pb_a = (
        pd.util.hash_array(t["a"].to_numpy(zero_copy_only=False))
        % np.uint64(n_parts)
    ).astype(np.int64)
    pb_b = (
        pd.util.hash_array(t["b"].to_numpy(zero_copy_only=False))
        % np.uint64(n_parts)
    ).astype(np.int64)
    return t.append_column("pb_a", pa.array(pb_a)).append_column(
        "pb_b", pa.array(pb_b)
    )


def dedup_tile_groups(t: pa.Table):
    """Shared head of a tile-verify finalize: one lexsort dedups the
    bucket's (a, b) pairs globally (the tile key is a function of the
    pair) AND yields the per-tile runs.  Returns (a, b, pb_a, pb_b,
    starts, ends) or None for an empty/schema-less bucket."""
    if t.num_rows == 0 or "a" not in t.column_names:
        return None
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    pb_a = t["pb_a"].to_numpy(zero_copy_only=False)
    pb_b = t["pb_b"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a, pb_b, pb_a))
    a, b, pb_a, pb_b = a[order], b[order], pb_a[order], pb_b[order]
    keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    a, b, pb_a, pb_b = a[keep], b[keep], pb_a[keep], pb_b[keep]
    starts = np.flatnonzero(
        np.concatenate([[True], (pb_a[1:] != pb_a[:-1]) | (pb_b[1:] != pb_b[:-1])])
    )
    ends = np.append(starts[1:], len(a))
    return a, b, pb_a, pb_b, starts, ends
