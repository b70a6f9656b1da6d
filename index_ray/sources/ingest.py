"""Source-format ingestion: JSONL / CSV / parquet -> the engine's parquet
layout, streaming (no driver materialization).

Raw training data rarely arrives as parquet — crawls and dumps land as
newline-delimited JSON or CSV.  ``ingest_corpus`` normalizes any of the
three into a directory of parquet shards that every pipeline in this
package (and ``build_index``'s footer-only docID scan) consumes.  The
conversion is one streaming Ray Data pass: blocks read -> blocks
written, so a 100 TB JSONL dump converts at aggregate-I/O speed with
object-store backpressure and per-shard resumable output.

Reference parity: the reference's only source is the crawler's parsed-
document feed (``index.h:370-381``); format ingestion is an extension a
standalone data engine needs.
"""

from __future__ import annotations

import os

import ray.data


def _infer_format(src: str) -> str:
    low = src.lower()
    for ext, fmt in ((".jsonl", "jsonl"), (".json", "jsonl"),
                     (".csv", "csv"), (".parquet", "parquet"),
                     (".orc", "orc")):
        if low.endswith(ext):
            return fmt
    raise ValueError(
        f"cannot infer ingest format from {src!r}; "
        "pass fmt='jsonl'|'csv'|'parquet'|'orc'"
    )


def ingest_corpus(src: str | list[str], out_dir: str, fmt: str | None = None) -> str:
    """Convert ``src`` (file, directory, or list) into parquet shards under
    ``out_dir``; returns ``out_dir``.  One streaming pass, schema inferred
    by Arrow's readers (ints stay int64, strings stay utf8 — pinned by the
    round-trip oracle ``jsonl_ingest``)."""
    first = src[0] if isinstance(src, list) else src
    fmt = fmt or _infer_format(first)
    if fmt == "jsonl":
        ds = ray.data.read_json(src)
    elif fmt == "csv":
        ds = ray.data.read_csv(src)
    elif fmt == "parquet":
        ds = ray.data.read_parquet(src)
    elif fmt == "orc":
        # Ray Data (this version) has no read_orc: stream the files as
        # bytes and decode with pyarrow.orc per file inside the task —
        # per-FILE granularity (an ORC dump is many files; stripe-level
        # splitting is the refinement if single files dominate)
        import io

        import pyarrow as pa

        def _parse_orc(batch: pa.Table) -> pa.Table:
            import pyarrow.orc as _orc

            tabs = [
                _orc.ORCFile(io.BytesIO(b)).read()
                for b in batch["bytes"].to_pylist()
            ]
            return pa.concat_tables(tabs)

        ds = ray.data.read_binary_files(src).map_batches(
            _parse_orc, batch_format="pyarrow", batch_size=1
        )
    else:
        raise ValueError(f"unknown ingest format {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    return out_dir
