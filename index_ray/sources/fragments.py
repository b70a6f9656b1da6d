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

if False:  # type-checking only; ray.data is imported lazily in driver-side
    import ray.data  # noqa


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


def _spec_items(specs: list[RowGroupSpec]) -> list[dict]:
    return [
        {
            "path": s.path,
            "row_group": s.row_group,
            "base_docid": s.base_docid,
            "num_rows": s.num_rows,
        }
        for s in specs
    ]


def fragment_dataset(
    specs: list[RowGroupSpec],
    columns: list[str] | None = None,
    docid_col: str = "docID",
    row_groups_per_task: int = 1,
):
    """Streaming Dataset over the specs with docIDs attached at the read."""
    import ray.data  # driver-side only; actors must not pay this import

    return ray.data.from_items(_spec_items(specs)).map_batches(
        _ReadRowGroups(columns, docid_col),
        batch_format="pyarrow",
        batch_size=max(1, row_groups_per_task),
    )


class ReadApply:
    """Read row groups AND apply a transform chain inside one actor stage.

    The unit of work is one row-group *spec* row (``batch_size=1`` upstream
    of this class), so task granularity == row group and the streaming
    executor parallelizes across the whole actor pool.  Keeping the read
    and the per-doc transform in the same actor is deliberate: a separate
    tiny spec-row stage otherwise gets fused into the downstream actor with
    row-based batching, collapsing 64 specs into one task (observed 10x
    under-parallelization).

    ``fn_chain`` is a list of (factory, args) constructed once per actor;
    each produced callable maps an Arrow table slice (``doc_batch`` docs)
    to an Arrow table, composed left to right.
    """

    def __init__(
        self,
        columns: list[str] | None,
        docid_col: str,
        id_col: str | None,
        fn_chain: list,
        doc_batch: int = 512,
        sink: tuple | None = None,
    ):
        self.columns = columns
        self.id_col = id_col
        self.docid_col = docid_col
        self.fns = [factory(*args) for factory, args in fn_chain]
        self.doc_batch = doc_batch
        self.sink = sink[0](*sink[1]) if sink is not None else None

    def __call__(self, spec_batch: pa.Table):
        paths = spec_batch["path"].to_pylist()
        rgs = spec_batch["row_group"].to_pylist()
        bases = spec_batch["base_docid"].to_pylist()
        for path, rg, base in zip(paths, rgs, bases):
            tbl = pq.ParquetFile(path).read_row_group(rg, columns=self.columns)
            ids = pa.array(
                np.arange(base, base + len(tbl), dtype=np.int64), type=pa.int64()
            )
            tbl = tbl.append_column(self.docid_col, ids)
            if self.id_col:
                i = tbl.schema.get_field_index(self.docid_col)
                tbl = tbl.set_column(
                    i, self.docid_col, tbl[self.id_col].cast(pa.int64())
                )
            spec = {"path": path, "row_group": rg, "base_docid": base}
            if self.sink is not None:
                # per-row-group side output; file name derives from the
                # spec => idempotent under task retry
                self.sink(tbl, spec)
            for off in range(0, len(tbl), self.doc_batch):
                part = tbl.slice(off, min(self.doc_batch, len(tbl) - off))
                for fn in self.fns:
                    part = fn(part)
                yield part
            for fn in self.fns:
                # row-group-level sidecar flush (e.g. docmap written from the
                # same tokenization pass)
                flush = getattr(fn, "flush_sidecar", None)
                if flush is not None:
                    flush(spec)


def read_apply_dataset(
    specs: list[RowGroupSpec],
    columns: list[str] | None,
    id_col: str | None,
    fn_chain: list,
    concurrency,
    doc_batch: int = 512,
    docid_col: str = "docID",
    sink: tuple | None = None,
):
    """from_items(specs) -> ReadApply actor pool, one spec per task call."""
    import ray.data  # driver-side only; actors must not pay this import

    return ray.data.from_items(_spec_items(specs)).map_batches(
        ReadApply,
        fn_constructor_args=(columns, docid_col, id_col, fn_chain, doc_batch, sink),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    )
