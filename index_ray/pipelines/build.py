"""The index build pipeline — Ray-Data-native inverted-index construction.

Lifecycle (SURVEY.md §3.4), per build chunk (= contiguous docID range, the
distributed analogue of the reference's numbered chunk files,
``/root/reference/index.cpp:60-76``):

    read_apply_dataset(chunk)                     [metadata-derived docIDs]
      -> TokenizeBlob (actor pool)                [tokenize + map-side combine
                                                   + docmap/stats sidecars]
      -> groupby("part").map_groups(pack+write)   [THE shuffle, hash(term,salt)]
      -> block metadata -> groupby("term") lexicon

plus one corpus-wide sampled census that broadcasts the hot-term set
(``ray.put`` once, read in each tokenizer actor's ``__init__``) used for
docID-range salting of skewed terms.

State lives only in (a) immutable chunk output files, (b) per-chunk
manifests, (c) the final ``stats.json`` — no shared mutable index
(the reference's ``HashTable<string, PostingList>`` single-process builder,
``/root/reference/index.h:286-328``, deliberately becomes this shuffle).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum

from ..sources.fragments import (
    read_apply_dataset,
    scan_fragments,
    split_chunks,
    total_docs,
)
from ..stages.pack import merge_blob_partition
from ..stages.tokenize_stage import PartialTermCounts, TokenizeBlob
from ..state.manifest import (
    config_fingerprint,
    list_output_files,
    manifest_path,
    read_json,
    validate_chunk,
    write_json_atomic,
)

@dataclass
class BuildConfig:
    tokenizer: str = "code"              # "code" | "simple" (SURVEY.md §7.4)
    text_col: str = "content"
    id_col: str | None = None            # use an existing int64 id column as docID
    keep_cols: tuple = ()                # extra passthrough columns -> docmap
    chunk_docs: int = 1_000_000          # docs per build chunk (resume granularity)
    num_parts: int = 32                  # pack hash partitions per chunk
    batch_size: int = 256                # docs per tokenize batch
    hot_sample_frac: float = 0.02        # census sample fraction
    hot_df_frac: float = 0.20            # hot iff sampled df >= frac * sampled docs
    min_sample_docs: int = 200
    salt_docs: int = 16384               # docID range width per salted hot-term block
    max_block_postings: int = 1 << 17
    row_groups_per_task: int = 1
    positions: bool = False              # store within-doc token positions (phrase queries)
    field_col: str | None = None         # index terms ALSO under "{field}:{term}" keys
    head_tokens: int = 0                 # first H tokens ALSO under "head:{term}" keys

    pipeline_chunks: int = 2             # concurrent chunk builds (driver threads)

    FORMAT_VERSION = 3  # bump when the on-disk shard layout changes

    def fingerprint(self) -> str:
        d = asdict(self)
        d["__format__"] = self.FORMAT_VERSION
        return config_fingerprint(d)


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    total_tokens: int
    n_chunks: int
    chunks_skipped: int
    hot_terms: list = field(default_factory=list)
    phase_seconds: dict = field(default_factory=dict)


def _pool(cfg: BuildConfig, n_tasks: int | None = None):
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # Leave ~1/4 of the CPUs out of the tokenize pool.  Two reasons: with
    # chunk pipelining (pipeline_chunks > 1) the slack lets chunk k's
    # post-shuffle pack/write tail overlap chunk k+1's tokenization; and
    # even in a single-chunk build (where the groupby sort is an
    # all-to-all barrier and overlap is impossible) a full-width pool of
    # memory-heavy actors measurably LOSES to the reserved pool on this
    # class of host (interleaved A/B at 8 CPUs, 400k docs: full-pool warm
    # min 87s vs reserved 63s) — tokenize actors are bandwidth-bound, so
    # the marginal actors contend instead of adding throughput while also
    # starving Ray's own sort/driver work.
    hi = max(2, cpus - max(1, cpus // 4))
    if n_tasks is not None:
        hi = max(1, min(hi, n_tasks))
    return hi  # fixed-size pool: starts immediately, no autoscale ramp


def census_hot_terms(specs, cfg: BuildConfig, n_docs: int):
    """Sampled hot-term census -> (object ref of frozenset, hot list).

    Deterministic in (input fragments, tokenizer, census params), so the
    result is cached content-addressed under /tmp: one census per corpus,
    reused by every rebuild/chunk — at 10^12 scale the census is a one-off
    prologue, not a per-run serial term.
    """
    if cfg.salt_docs <= 0:
        return None, []
    import hashlib as _hashlib
    import json as _json

    key_src = _json.dumps(
        [
            [(s.path, s.row_group, s.num_rows) for s in specs],
            cfg.tokenizer,
            cfg.text_col,
            cfg.id_col,
            cfg.hot_sample_frac,
            cfg.hot_df_frac,
            cfg.min_sample_docs,
        ],
        default=str,
    ).encode()
    cache_path = f"/tmp/index_ray_census_{_hashlib.sha1(key_src).hexdigest()[:16]}.json"
    cached = read_json(cache_path)
    if isinstance(cached, list):
        hot = cached
        return (ray.put(frozenset(hot)) if hot else None), hot
    # sample whole row groups (footer-known sizes): no full-input read
    target = max(cfg.min_sample_docs, cfg.hot_sample_frac * n_docs)
    k = max(1, round(n_docs / max(target, 1)))
    sample_specs = specs[::k]
    sampled_docs = sum(s.num_rows for s in sample_specs)
    cols = [cfg.text_col] + ([cfg.id_col] if cfg.id_col else [])
    runs = read_apply_dataset(
        sample_specs,
        cols,
        cfg.id_col,
        [(PartialTermCounts, (cfg.tokenizer, cfg.text_col))],
        concurrency=_pool(cfg, len(sample_specs)),
        doc_batch=cfg.batch_size,
    )
    agg = runs.groupby("term").aggregate(Sum("df_part", alias_name="df"))
    thresh = max(2.0, cfg.hot_df_frac * sampled_docs)

    def keep_hot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["df"], pa.scalar(thresh)))

    hot_rows = agg.map_batches(keep_hot, batch_format="pyarrow").take_all()
    hot = sorted(r["term"] for r in hot_rows)
    write_json_atomic(cache_path, hot)
    return (ray.put(frozenset(hot)) if hot else None), hot


def _make_packer(parts_dir: str, max_block_postings: int, positions: bool = False):
    def pack_and_write(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        packed = merge_blob_partition(group, max_block_postings, positions)
        path = os.path.join(parts_dir, f"part-{part:05d}.parquet")
        tmp = path + f".{os.getpid()}.tmp"
        pq.write_table(packed, tmp)
        os.replace(tmp, path)  # idempotent under task retry
        return packed.select(["term", "df", "cf"])

    return pack_and_write


def build_chunk(chunk_specs, cid: int, out_dir: str, cfg: BuildConfig, hot_ref):
    chunk_dir = os.path.join(out_dir, "chunks", f"chunk-{cid:05d}")
    fp = cfg.fingerprint()
    m = validate_chunk(chunk_dir, fp)
    if m is not None:
        return m, True
    if os.path.exists(chunk_dir):
        shutil.rmtree(chunk_dir)
    parts_dir = os.path.join(chunk_dir, "parts")
    os.makedirs(parts_dir, exist_ok=True)

    # --- ONE fused pass: read row group -> docmap sink (sha256 + doclen)
    #     -> TokenizeBlob combiner -> groupby(part) -> merge+pack+write.
    # Input is read once; the shuffle carries varint blobs, not raw runs.
    dm_cols = list(cfg.keep_cols) or None  # None = all columns pass through
    if dm_cols is not None:
        dm_cols = [cfg.text_col] + ([cfg.id_col] if cfg.id_col else []) + dm_cols
        if cfg.field_col and cfg.field_col not in dm_cols:
            dm_cols.append(cfg.field_col)
    docmap_dir = os.path.join(chunk_dir, "docmap")
    t0 = time.time()
    runs = read_apply_dataset(
        chunk_specs,
        dm_cols,
        cfg.id_col,
        [
            (
                TokenizeBlob,
                (
                    cfg.tokenizer,
                    cfg.text_col,
                    "docID",
                    cfg.num_parts,
                    max(cfg.salt_docs, 1),
                    hot_ref,
                    docmap_dir,  # docmap written from the same tokenize pass
                    cfg.positions,
                    cfg.field_col,
                    cfg.head_tokens,
                ),
            )
        ],
        concurrency=_pool(cfg, len(chunk_specs)),
        doc_batch=cfg.batch_size,
    )
    meta = runs.groupby("part").map_groups(
        _make_packer(parts_dir, cfg.max_block_postings, cfg.positions),
        batch_format="pyarrow",
    )
    lex = meta.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("cf", alias_name="cf")
    )
    lex.write_parquet(os.path.join(chunk_dir, "lexicon"))
    if os.environ.get("INDEX_RAY_STATS"):
        print(lex.stats())
    phases = {"build_pipeline": round(time.time() - t0, 3)}
    t0 = time.time()

    # --- chunk stats: sum the per-row-group stats sidecars the tokenize
    # tasks wrote (tiny JSONs — no driver-side docmap data rescan) ---
    docs = tokens = 0
    doc_min, doc_max = None, None
    dm_dir = os.path.join(chunk_dir, "docmap")
    for f in sorted(os.listdir(dm_dir)):
        if not f.endswith(".stats.json"):
            continue
        s = read_json(os.path.join(dm_dir, f)) or {}
        docs += s.get("docs", 0)
        tokens += s.get("tokens", 0)
        if "doc_min" in s:
            doc_min = s["doc_min"] if doc_min is None else min(doc_min, s["doc_min"])
            doc_max = s["doc_max"] if doc_max is None else max(doc_max, s["doc_max"])

    phases["chunk_stats_scan"] = round(time.time() - t0, 3)
    manifest = {
        "chunk": cid,
        "phase_seconds": phases,
        "config_fingerprint": fp,
        "input_fragments": [
            {"path": s.path, "row_group": s.row_group, "rows": s.num_rows}
            for s in chunk_specs
        ],
        "docs": docs,
        "tokens": tokens,
        "doc_min": doc_min,
        "doc_max": doc_max,
        "files": list_output_files(chunk_dir),
    }
    write_json_atomic(manifest_path(chunk_dir), manifest)
    return manifest, False


def build_index(source, out_dir: str, cfg: BuildConfig | None = None) -> BuildResult:
    """Build the full index under ``out_dir``; resumable at chunk level.

    Ray Data's default 50% per-operator resource reservation starves the
    post-shuffle pack stage of a 5-operator pipeline (observed: ~3
    concurrent pack tasks on an 8-CPU cluster with CPUs idle); most CPUs
    must sit in the shared pool so whichever stage has work can take them.
    The ratio is lowered for the duration of the build and restored.
    """
    import ray.data as _rd

    ctx = _rd.DataContext.get_current()
    prev_ratio = ctx.op_resource_reservation_ratio
    ctx.op_resource_reservation_ratio = min(prev_ratio, 0.2)
    try:
        return _build_index(source, out_dir, cfg)
    finally:
        ctx.op_resource_reservation_ratio = prev_ratio


def _build_index(source, out_dir: str, cfg: BuildConfig | None) -> BuildResult:
    cfg = cfg or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)
    specs = scan_fragments(source)
    n_docs = total_docs(specs)
    chunks = split_chunks(specs, cfg.chunk_docs)

    phase_seconds: dict = {}
    t0 = time.time()
    hot_ref, hot = census_hot_terms(specs, cfg, n_docs)
    phase_seconds["census"] = round(time.time() - t0, 3)

    # chunks build through a small thread pool so chunk k+1's tokenize
    # overlaps chunk k's pack/write tail — the streaming executors share
    # the Ray CPU pool, so this pipelines instead of oversubscribing.
    # (Each thread drives its own Dataset execution; at 10^6 chunks the
    # driver loop is submit-k-ahead, never a serial term.)
    from concurrent.futures import ThreadPoolExecutor

    # Ray's path resolution re-imports fsspec.implementations.http on EVERY
    # write (the failed import is never cached because aiohttp is absent),
    # and two builder threads importing it concurrently can observe a
    # partially-initialized module ("cannot import name HTTPFileSystem").
    # Make the import succeed once — with inert stand-ins for the missing
    # HTTP deps, which nothing in this offline engine ever calls — so the
    # module lands in sys.modules and the per-call import becomes a no-op.
    import sys as _sys
    import types as _types

    for _name in ("aiohttp", "yarl"):
        if _name not in _sys.modules:
            try:
                __import__(_name)
            except ModuleNotFoundError:
                _sys.modules[_name] = _types.ModuleType(_name)
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        pass

    t0 = time.time()
    workers = max(1, min(cfg.pipeline_chunks, len(chunks)))
    if workers == 1:
        results = [
            build_chunk(specs, cid, out_dir, cfg, hot_ref)
            for cid, specs in enumerate(chunks)
        ]
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [
                ex.submit(build_chunk, specs, cid, out_dir, cfg, hot_ref)
                for cid, specs in enumerate(chunks)
            ]
            results = [f.result() for f in futs]
    manifests = [m for m, _ in results]
    skipped = sum(s for _, s in results)
    for m in manifests:
        for k, v in m.get("phase_seconds", {}).items():
            phase_seconds[k] = round(phase_seconds.get(k, 0.0) + v, 3)
    phase_seconds["chunks_total"] = round(time.time() - t0, 3)
    t0 = time.time()

    # --- global lexicon: merge per-chunk (term, df, cf) ---
    import glob as _glob

    lex_files = [
        f
        for cid in range(len(chunks))
        for f in sorted(
            _glob.glob(
                os.path.join(out_dir, "chunks", f"chunk-{cid:05d}", "lexicon", "*.parquet")
            )
        )
    ]
    glex_dir = os.path.join(out_dir, "lexicon")
    if os.path.exists(glex_dir):
        shutil.rmtree(glex_dir)
    total_bytes = sum(os.path.getsize(f) for f in lex_files)
    if total_bytes < 256 << 20:
        # vocabulary fits on the driver: merge without a Ray job
        os.makedirs(glex_dir, exist_ok=True)
        t = pa.concat_tables([pq.read_table(f) for f in lex_files])
        df = t.to_pandas().groupby("term", as_index=False)[["df", "cf"]].sum()
        df = df.sort_values("term").reset_index(drop=True)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(glex_dir, "part-00000.parquet"),
        )
    else:
        (
            ray.data.read_parquet(lex_files)
            .groupby("term")
            .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
            .sort("term")
            .write_parquet(glex_dir)
        )

    phase_seconds["lexicon_merge"] = round(time.time() - t0, 3)
    total_tokens = sum(m["tokens"] for m in manifests)
    stats = {
        "N": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "config_fingerprint": cfg.fingerprint(),
        "tokenizer": cfg.tokenizer,
        "positions": cfg.positions,
        "field_col": cfg.field_col,
        "head_tokens": cfg.head_tokens,
        "hot_terms": hot,
        "chunks": [
            {
                "chunk": m["chunk"],
                "docs": m["docs"],
                "doc_min": m["doc_min"],
                "doc_max": m["doc_max"],
            }
            for m in manifests
        ],
    }
    write_json_atomic(os.path.join(out_dir, "stats.json"), stats)
    return BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        total_tokens=total_tokens,
        n_chunks=len(chunks),
        chunks_skipped=skipped,
        hot_terms=hot,
        phase_seconds=phase_seconds,
    )


def load_stats(out_dir: str) -> dict:
    s = read_json(os.path.join(out_dir, "stats.json"))
    if s is None:
        raise FileNotFoundError(f"no stats.json under {out_dir} — build first")
    return s
