"""Distributed joins — the general-purpose operators Ray Data's Dataset
API does not ship natively.

Two shapes, chosen by the small side's size (SURVEY.md §2.4 maps the
reference's lookups to exactly these):

- broadcast join: the keyed small side goes to the object store ONCE
  (``ray.put``) and every ``map_batches`` task reads it — no shuffle at
  all (used by ``relational.orders_by_nation``; right for dimension
  tables).
- ``hash_join`` (here): both sides large — a bucketed shuffle join.  Each
  side tags its rows with ``hash(key) % num_buckets`` in a streaming
  ``map_batches`` pass, the tagged union shuffles ONCE on the bucket id,
  and each bucket group performs a vectorized Arrow hash join
  (``pa.Table.join``) between its two sides.  Buckets (not raw keys) are
  the groupby key, so the per-group Python overhead is O(num_buckets),
  never O(distinct keys), and skewed keys spread across batches still
  land in one bucket whose join is a single C++ call.

Scale notes: the shuffle moves each row exactly once; ``num_buckets``
should be ~2-4x the cluster's core count so bucket joins pipeline behind
the shuffle.  A bucket whose two sides exceed worker memory needs a
finer bucket count (the operator takes it as a parameter rather than
guessing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_BUCKET = "__jbucket__"
_SIDE = "__jside__"


def _knuth_bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic hash -> bucket id.  Int64 keys take the multiplicative
    fast path; any other dtype (strings included) hashes through pandas'
    deterministic array hash — the same kernel ``util._bucket_of`` relies
    on across workers."""
    if np.issubdtype(keys.dtype, np.integer):
        h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return (h >> np.uint64(33)).astype(np.int64) % num_buckets
    import pandas as pd

    return (pd.util.hash_array(keys) % np.uint64(num_buckets)).astype(np.int64)


def _tag(side: int, on: str, num_buckets: int):
    def add(batch: pa.Table) -> pa.Table:
        keys = batch[on].to_numpy(zero_copy_only=False)
        b = _knuth_bucket(keys, num_buckets)
        return batch.append_column(_BUCKET, pa.array(b)).append_column(
            _SIDE, pa.array(np.full(len(batch), side, dtype=np.int8))
        )

    return add


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    num_buckets: int = 64,
    how: str = "inner",
) -> ray.data.Dataset:
    """Join two Datasets on a key column (int64 or string) via ONE bucket
    shuffle.

    Column names (other than ``on``) must be disjoint between the sides.
    ``how`` is forwarded to the per-bucket ``pa.Table.join`` ("inner",
    "left outer", ...).
    """
    lschema, rschema = left.schema(), right.schema()
    lcols = [c for c in lschema.names if c != on]
    rcols = [c for c in rschema.names if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision between join sides: {sorted(overlap)}")
    types = {
        **dict(zip(rschema.names, rschema.types)),
        **dict(zip(lschema.names, lschema.types)),
    }

    tagged = left.map_batches(
        _tag(0, on, num_buckets), batch_format="pyarrow"
    ).union(right.map_batches(_tag(1, on, num_buckets), batch_format="pyarrow"))

    def take_side(g: pa.Table, mask: np.ndarray, cols: list[str]) -> pa.Table:
        t = g.filter(pa.array(mask))
        # a bucket whose rows all came from ONE side concatenates to that
        # side's schema only — null-fill the other side's columns so the
        # empty side still joins with the right shape
        for c in cols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, types[c]))
        return t.select(cols)

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        g = group.drop_columns([_BUCKET, _SIDE])
        lmask = side == 0
        lt = take_side(g, lmask, [on] + lcols)
        rt = take_side(g, ~lmask, [on] + rcols)
        return lt.join(rt, keys=on, join_type=how)

    return tagged.groupby(_BUCKET).map_groups(join_bucket, batch_format="pyarrow")
