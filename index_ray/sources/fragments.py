"""Deterministic docID assignment from Parquet metadata.

The reference assigns docID = position in a chunk-local ``documents`` vector
(``/root/reference/index.h:294``, ``index.cpp:161``) — write order, single
process.  Distributed equivalent (SURVEY.md §7.4): docID = global row number
under *sorted fragment-file order*, derived from a metadata-only footer scan
(cumulative row-group offsets).  Never depends on execution order, so any
parallelism level produces identical docIDs (parallelism-invariance test,
SURVEY.md §5.2.5).

At 10^12-file scale the footer scan itself is a Ray stage over file lists;
here it is a driver-side loop over footers (no data pages are read).

``fragment_dataset`` turns a spec list into a streaming
``ray.data.Dataset``: one lightweight item per row group, read inside
``map_batches`` tasks with column pruning, each emitting an Arrow table with
the ``docID`` column attached.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


@dataclass(frozen=True)
class RowGroupSpec:
    path: str
    row_group: int
    base_docid: int
    num_rows: int


def scan_fragments(source: str | list[str]) -> list[RowGroupSpec]:
    """Footer-only scan: sorted files -> per-row-group global docID bases."""
    if isinstance(source, str):
        if os.path.isdir(source):
            files = sorted(glob.glob(os.path.join(source, "*.parquet")))
        else:
            files = [source]
    else:
        files = sorted(source)
    if not files:
        raise ValueError(f"no parquet files under {source!r}")
    specs: list[RowGroupSpec] = []
    base = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            specs.append(RowGroupSpec(f, rg, base, n))
            base += n
    return specs


def total_docs(specs: list[RowGroupSpec]) -> int:
    last = specs[-1]
    return last.base_docid + last.num_rows


def split_chunks(
    specs: list[RowGroupSpec], chunk_docs: int
) -> list[list[RowGroupSpec]]:
    """Group row-group specs into build chunks of ~chunk_docs documents.

    Chunk boundaries fall on row-group boundaries, so each chunk covers a
    contiguous, disjoint docID range — the distributed analogue of the
    reference's numbered chunk files (``/root/reference/index.cpp:60-76``).
    """
    chunks: list[list[RowGroupSpec]] = []
    cur: list[RowGroupSpec] = []
    cur_rows = 0
    for s in specs:
        cur.append(s)
        cur_rows += s.num_rows
        if cur_rows >= chunk_docs:
            chunks.append(cur)
            cur, cur_rows = [], 0
    if cur:
        chunks.append(cur)
    return chunks


class _ReadRowGroups:
    """Stateless row-group reader used inside map_batches (tasks)."""

    def __init__(self, columns: list[str] | None, docid_col: str):
        self.columns = columns
        self.docid_col = docid_col

    def __call__(self, batch: pa.Table):
        paths = batch["path"].to_pylist()
        rgs = batch["row_group"].to_pylist()
        bases = batch["base_docid"].to_pylist()
        for path, rg, base in zip(paths, rgs, bases):
            t = pq.ParquetFile(path).read_row_group(rg, columns=self.columns)
            ids = pa.array(
                np.arange(base, base + len(t), dtype=np.int64), type=pa.int64()
            )
            yield t.append_column(self.docid_col, ids)


def fragment_dataset(
    specs: list[RowGroupSpec],
    columns: list[str] | None = None,
    docid_col: str = "docID",
    row_groups_per_task: int = 1,
) -> ray.data.Dataset:
    """Streaming Dataset over the specs with docIDs attached at the read."""
    items = [
        {
            "path": s.path,
            "row_group": s.row_group,
            "base_docid": s.base_docid,
            "num_rows": s.num_rows,
        }
        for s in specs
    ]
    return ray.data.from_items(items).map_batches(
        _ReadRowGroups(columns, docid_col),
        batch_format="pyarrow",
        batch_size=max(1, row_groups_per_task),
    )
