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
    # (term, salt) -> part hash-space.  Parts are the shuffle key, not the
    # task granularity: the hash exchange folds them into shuffle_partitions
    # buckets, so a fine part space (many parts per bucket) evens out bucket
    # sizes.  With shuffle="sort" each part is also one output file.
    num_parts: int = 512
    batch_size: int = 512                # docs per tokenize batch (measured
                                         # optimum: per-batch vocab overhead
                                         # amortizes, working set still in cache)
    hot_sample_frac: float = 0.02        # census sample fraction
    hot_df_frac: float = 0.20            # hot iff sampled df >= frac * sampled docs
    min_sample_docs: int = 200
    salt_docs: int = 16384               # docID range width per salted hot-term block
    max_block_postings: int = 1 << 17
    row_groups_per_task: int = 1
    positions: bool = False              # store within-doc token positions (phrase queries)
    field_col: str | None = None         # index terms ALSO under "{field}:{term}" keys
    head_tokens: int = 0                 # first H tokens ALSO under "head:{term}" keys
    # style_head > 0: per-posting 1-bit style flag (term first occurs within
    # the first H tokens), stored in the wire tf slot as (tf << 1) | style —
    # the reference's per-posting style/weight bits
    # (/root/reference/index.h:44-49, payload layout index.h:56-60) without
    # head_tokens' posting duplication.  Weighted at rank time via
    # ``BM25Searcher.search(..., style_weight=w)``.
    style_head: int = 0
    # 2-bit variant of the above (mutually exclusive with style_head): the
    # reference's 4-class style enum (Normal/Heading/Italic/Bold,
    # /root/reference/index.h:44-49) widened onto the wire as
    # (tf << 2) | class.  Classes by first-occurrence depth: ordinal
    # p < h1 -> 3, < h2 -> 2, < h3 -> 1, else 0 (3 ascending thresholds).
    # Weighted at rank time via ``search(..., style_weight=(w0,w1,w2,w3))``.
    style_levels: tuple | None = None
    # store the FORWARD index too: per-chunk tvec/ sidecars of (docID,
    # term, tf) rows — Lucene's "stored term vectors".  doc -> terms is
    # unanswerable from the inverted shards without a full lexicon scan,
    # so it is captured in the same tokenize pass (query.term_vectors).
    term_vectors: bool = False
    # write the reversed-term lexicon sidecar (``lexicon_rev/``) during
    # finalize, so suffix wildcards (``*s``) are range probes from the
    # first commit instead of vocabulary sweeps — at 10^12 scale every
    # index wants this on day one (Lucene's ReversedWildcardFilter as a
    # build step rather than an opt-in maintenance pass).  Once present,
    # ``merge_lexicon`` refreshes it on every lexicon rewrite (append,
    # purge, compaction), preserving the invariant "the sidecar, when
    # present, always mirrors the live lexicon".
    reverse_lexicon: bool = True

    pipeline_chunks: int = 2             # concurrent phase-B shuffles (driver threads)
    # "bucket" (default): map-side bucketing — tokenize workers return one
    # table per hash bucket (num_returns fan-out) and plain pack tasks
    # consume each bucket's refs directly: blob bytes cross the object
    # store exactly ONCE, with no sort/exchange machinery at all.
    # "sort": Ray Data's range-sort shuffle; "hash": actor-based streaming
    # hash exchange — both kept as Dataset-native options (measured slower
    # here: the exchange copies the blob stream 2-3x).
    shuffle: str = "bucket"
    shuffle_partitions: int = 0          # hash only; 0 -> auto (16 x cluster CPUs)
    # bucket only; 0 -> auto: ~12k docs of postings per pack task (measured
    # knee — larger per-task merges trip allocator first-touch costs, and
    # a chunk-derived count keeps the output layout independent of cluster
    # size, so resumes are valid across parallelism changes)
    n_buckets: int = 0

    FORMAT_VERSION = 3  # bump when the on-disk shard layout changes

    @property
    def style_bits(self) -> int:
        """Style wire width: 0 (none), 1 (head flag) or 2 (4-class enum)."""
        if self.style_levels is not None:
            if self.style_head:
                raise ValueError("style_head and style_levels are exclusive")
            return 2
        return 1 if self.style_head else 0

    def fingerprint(self) -> str:
        d = asdict(self)
        # pure driver-side execution knobs never change on-disk bytes —
        # excluding them lets a crashed build resume (and appends proceed)
        # after the user retunes concurrency
        d.pop("pipeline_chunks", None)
        # the reversed-term sidecar is a finalize-time auxiliary dir, not
        # chunk bytes: toggling it must not invalidate resumable chunks
        d.pop("reverse_lexicon", None)
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
    # Leave ~1/4 of the CPUs out of the tokenize pool: with the streaming
    # chunk pipeline the slack keeps chunk k's shuffle+pack moving while
    # chunk k+1 tokenizes (the big pack drain runs after the pool is
    # released), and a full-width pool of memory-heavy actors measurably
    # LOSES on this class of host (interleaved A/B at 8 CPUs, 400k docs:
    # full-pool warm min 87s vs reserved 63s; cpus//8 reserve also lost,
    # 38.1 vs 35.8) — the marginal actors contend for memory bandwidth
    # instead of adding throughput while starving Ray's own sort/driver
    # work.
    reserve = int(os.environ.get("INDEX_RAY_POOL_RESERVE", "0")) or max(1, cpus // 4)
    hi = max(2, cpus - reserve)
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
    agg = runs.groupby(
        "term", num_partitions=max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    ).aggregate(Sum("df_part", alias_name="df"))
    thresh = max(2.0, cfg.hot_df_frac * sampled_docs)

    def keep_hot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["df"], pa.scalar(thresh)))

    hot_rows = agg.map_batches(keep_hot, batch_format="pyarrow").take_all()
    hot = sorted(r["term"] for r in hot_rows)
    write_json_atomic(cache_path, hot)
    return (ray.put(frozenset(hot)) if hot else None), hot


def _make_packer(
    parts_dir: str,
    max_block_postings: int,
    positions: bool = False,
    style: int = 0,
):
    def pack_and_write(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64()), "cf": pa.array([], pa.int64())}
            )
        # one task may hold a whole hash partition (several `part` values);
        # merge_blob_partition sorts by (term, salt) itself, and a (term,
        # salt) group lives in exactly one part, so mixing parts is safe.
        # The min part is a stable name for the partition (parts are
        # disjoint across partitions), keeping the write idempotent.
        import pyarrow.compute as pc

        part = int(pc.min(group["part"]).as_py())
        packed = merge_blob_partition(group, max_block_postings, positions, style)
        path = os.path.join(parts_dir, f"part-{part:05d}.parquet")
        tmp = path + f".{os.getpid()}.tmp"
        pq.write_table(packed, tmp)
        os.replace(tmp, path)  # idempotent under task retry
        return packed.select(["term", "df", "cf"])

    return pack_and_write


def pack_chunk(state, chunk_specs, cid: int, cfg: BuildConfig):
    """Phase B: shuffle the materialized blob runs, merge+pack+write the
    posting shards, and write the per-chunk lexicon + manifest."""
    runs, chunk_dir, parts_dir, phases = state
    t0 = time.time()
    packer = _make_packer(
        parts_dir, cfg.max_block_postings, cfg.positions, cfg.style_bits
    )
    if cfg.shuffle == "hash":
        # streaming exchange: shuffle-map tasks partition tokenize output
        # blocks as they appear (overlapping the tokenize stage) and push
        # them to 0-CPU aggregator actors; finalize emits one block per
        # hash partition, packed whole by one task (no range sort at all).
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # fine partitions: the pack working set per task stays small enough
        # that worker arenas recycle (first-touch page faults are the wall
        # on this host class), and hash skew over parts evens out
        np_ = cfg.shuffle_partitions or max(64, 16 * cpus)
        meta = runs.repartition(np_, keys=["part"], sort=False).map_batches(
            packer, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        meta = runs.groupby("part").map_groups(packer, batch_format="pyarrow")
    # per-chunk lexicon = RAW per-block (term, df, cf) partials: the global
    # merge re-aggregates across chunks anyway, so a per-chunk groupby here
    # would be a second shuffle for nothing (rows are ~one per packed block)
    lex = meta
    lex.write_parquet(os.path.join(chunk_dir, "lexicon"))
    if os.environ.get("INDEX_RAY_STATS"):
        print(lex.stats())
    phases["shuffle_pack"] = round(time.time() - t0, 3)
    return _finish_chunk(chunk_dir, chunk_specs, cid, cfg, phases)


def _finish_chunk(chunk_dir, chunk_specs, cid: int, cfg: BuildConfig, phases):
    """Chunk epilogue: sum the per-row-group stats sidecars the tokenize
    tasks wrote (tiny JSONs — no driver-side docmap data rescan) and write
    the chunk manifest atomically."""
    t0 = time.time()
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
        "config_fingerprint": cfg.fingerprint(),
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
    return manifest


@ray.remote
class _TokenizeWorker:
    """Persistent phase-A actor: one ReadApply/TokenizeBlob instance reused
    across ALL chunks of a build (a per-chunk `map_batches` actor pool pays
    ~2-3 s of spawn + census fetch + warmup per chunk, which dominates once
    chunks are pipelined).  Driven by the raw-task loop in `_pipelined_build`
    — the one place this engine drops below the Dataset API, because a
    Dataset actor pool is scoped to a single execution and cannot route
    per-spec completions back to their chunk (nor fan a task's output out
    to per-bucket return objects)."""

    def __init__(self):
        from ..util import retain_malloc_pages

        retain_malloc_pages()
        self._ra = None
        self._busy = 0.0

    def ping(self) -> bool:
        return True

    def busy_seconds(self, reset: bool = False) -> float:
        """Cumulative in-actor compute time — the per-stage attribution the
        BENCH stage breakdown reads (tokenize and pack overlap in the
        pipelined build, so wall-clock alone cannot split them)."""
        b = self._busy
        if reset:
            self._busy = 0.0
        return b

    def reconfigure(self, columns, docid_col, id_col, fn_chain, doc_batch):
        """Rebind this worker to a build's config — pools persist across
        builds in a session (see :func:`_session_pools`), so per-build state
        (tokenizer, census hot-term ref, partitioning) arrives here rather
        than in ``__init__``."""
        from ..sources.fragments import ReadApply

        self._ra = ReadApply(columns, docid_col, id_col, fn_chain, doc_batch)
        return True

    def run(self, item: dict, docmap_dir: str, n_buckets: int = 0):
        """Tokenize one row-group spec.  With ``n_buckets`` (bucket
        shuffle), returns one table per bucket (``part % n_buckets``) via
        ``num_returns`` PLUS a trailing int sentinel — the driver
        ``ray.get``s only the sentinel, which is how a task failure
        surfaces without shipping any bucket bytes to the driver."""
        from ..stages.pack import BLOB_SCHEMA

        t_in = time.time()
        os.makedirs(docmap_dir, exist_ok=True)
        self._ra.fns[0].docmap_dir = docmap_dir  # per-chunk sidecar routing
        out = [t for t in self._ra(pa.Table.from_pylist([item])) if len(t)]
        t = pa.concat_tables(out) if out else BLOB_SCHEMA.empty_table()
        if not n_buckets:
            self._busy += time.time() - t_in
            return t
        if len(t) == 0:
            self._busy += time.time() - t_in
            return tuple([t] * n_buckets) + (0,)
        b = t["part"].to_numpy(zero_copy_only=False) % n_buckets
        order = np.argsort(b, kind="stable")
        bounds = np.searchsorted(b[order], np.arange(n_buckets + 1))
        # per-bucket take (not slice-of-sorted): take materializes compact
        # arrays, so each return object ships only its own rows
        res = tuple(
            t.take(pa.array(order[bounds[i] : bounds[i + 1]]))
            for i in range(n_buckets)
        ) + (len(t),)
        self._busy += time.time() - t_in
        return res


@ray.remote
class _PackWorker:
    """Reduce side of the bucket shuffle, as a PERSISTENT actor.

    A stateless ``@ray.remote`` pack task lands on whichever worker process
    is idle, and on this host class a cold process re-pays its whole merge
    working set (~hundreds of MB) at fresh-page speed — measured 5-20x the
    warm cost.  A fixed pool of pack actors, round-robined so every actor
    warms during the (compute-bound) tokenize stream, keeps each arena
    faulted exactly once per build instead of once per task."""

    def __init__(self):
        from ..util import retain_malloc_pages

        retain_malloc_pages()
        self._busy = 0.0

    def ping(self) -> bool:
        return True

    def busy_seconds(self, reset: bool = False) -> float:
        b = self._busy
        if reset:
            self._busy = 0.0
        return b

    def pack(
        self,
        parts_dir: str,
        lex_dir: str,
        max_block_postings: int,
        positions: bool,
        style: int,
        *tables: pa.Table,
    ) -> int:
        """Merge+pack one bucket's blob rows (possibly several ``part``
        values — ``merge_blob_partition`` sorts by (term, salt) itself and
        a (term, salt) group lives in exactly one bucket) and write the
        part + lexicon-partial parquet atomically."""
        import pyarrow.compute as pc

        t0 = time.time()
        tabs = [t for t in tables if t is not None and len(t)]
        if not tabs:
            return 0
        group = pa.concat_tables(tabs)
        part = int(pc.min(group["part"]).as_py())  # stable name: parts are
        packed = merge_blob_partition(group, max_block_postings, positions, style)
        if os.environ.get("INDEX_RAY_PACK_LOG"):
            with open(os.environ["INDEX_RAY_PACK_LOG"], "a") as fh:
                fh.write(
                    f"{os.getpid()} {time.time() - t0:.2f} {len(group)}\n"
                )
        path = os.path.join(parts_dir, f"part-{part:05d}.parquet")
        tmp = path + f".{os.getpid()}.tmp"
        pq.write_table(packed, tmp)
        os.replace(tmp, path)  # idempotent under task retry
        lex = packed.select(["term", "df", "cf"])
        lpath = os.path.join(lex_dir, f"lex-{part:05d}.parquet")
        ltmp = lpath + f".{os.getpid()}.tmp"
        pq.write_table(lex, ltmp)
        os.replace(ltmp, lpath)
        self._busy += time.time() - t0
        return len(packed)


_SESSION_POOLS: dict = {}


def session_pool_busy(reset: bool = False) -> dict:
    """Cumulative in-actor busy seconds of the session's persistent pools:
    {"tokenize_busy": s, "pack_busy": s, "n_tok": n, "n_pack": n}.  The
    pipelined build overlaps the two stages, so only in-actor accounting
    can attribute wall-clock to a stage (BENCH stage breakdown)."""
    pools = _SESSION_POOLS.get("pools")
    if not pools:
        return {"tokenize_busy": 0.0, "pack_busy": 0.0, "n_tok": 0, "n_pack": 0}
    tok, packw = pools
    tb = sum(ray.get([w.busy_seconds.remote(reset) for w in tok]))
    pb = sum(ray.get([w.busy_seconds.remote(reset) for w in packw]))
    return {
        "tokenize_busy": round(tb, 3),
        "pack_busy": round(pb, 3),
        "n_tok": len(tok),
        "n_pack": len(packw),
    }


def _session_pools(n_tok: int, n_pack: int):
    """Per-Ray-session persistent tokenize + pack actor pools.

    A build that spawns fresh actor processes re-pays every arena's
    first-touch page-fault cost (this host provisions fresh pages 50-100x
    slower than it recycles them, and the penalty recurs per process);
    a steady-state ingest service keeps its pools alive between jobs, so
    builds here reuse one session-scoped pool and ``reconfigure`` it per
    build.  Actors declare ``num_cpus=0`` because the driver dispatch loop
    in :func:`_pipelined_build` already bounds physical concurrency (one
    task per tokenize worker, a driver-side cap on inflight packs) — and a
    zero-CPU idle pool doesn't starve Dataset stages that run later in the
    same session.  On a multi-node cluster the equivalent is one pool per
    node under a placement group; local mode has no second node, so plain
    zero-CPU actors carry the same design.

    Pools are rebuilt when a new Ray session invalidates the cached
    handles (detected by a failed ping) or when a larger pool is needed.
    """
    cur = _SESSION_POOLS.get("pools")
    if cur is not None:
        tok, packw = cur
        try:
            # ping EVERY actor in each non-empty pool (a cached (tok, [])
            # pool from a shuffle='hash'/'sort' build must not be discarded
            # over an IndexError): one dead actor mid-pool would otherwise
            # be reused and fail every task routed to it
            pings = [a.ping.remote() for p in (tok, packw) for a in p]
            if pings:
                ray.get(pings, timeout=30)
        except Exception:
            for p in (tok, packw):  # release survivors of the dead pool
                for a in p:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
            cur = None
    if cur is not None and len(tok) >= n_tok and len(packw) >= n_pack:
        return tok[:n_tok], packw[:n_pack]
    if cur is not None:  # grow: keep warm actors, add the difference
        tok = tok + [
            _TokenizeWorker.options(num_cpus=0).remote()
            for _ in range(n_tok - len(tok))
        ]
        packw = packw + [
            _PackWorker.options(num_cpus=0).remote()
            for _ in range(n_pack - len(packw))
        ]
    else:
        tok = [_TokenizeWorker.options(num_cpus=0).remote() for _ in range(n_tok)]
        packw = [_PackWorker.options(num_cpus=0).remote() for _ in range(n_pack)]
    _SESSION_POOLS["pools"] = (tok, packw)
    return tok[:n_tok], packw[:n_pack]


def _pipelined_build(chunks, out_dir: str, cfg: BuildConfig, hot_ref, ex, cid0: int = 0):
    """Streaming chunk pipeline: tokenize tasks flow through a persistent
    actor pool in chunk order; the moment a chunk's last spec completes its
    shuffle+pack (phase B) is submitted to a worker thread, overlapping the
    next chunk's tokenization.  Submission is gated to `pipeline_chunks`
    chunks ahead of the oldest incomplete one, bounding object-store
    residency to ~(pipeline_chunks+1) chunks of blob runs at any scale.

    Returns (manifests in chunk order, n_skipped)."""
    from ..sources.fragments import _spec_items

    fp = cfg.fingerprint()
    done_manifests: dict[int, dict] = {}
    todo: list[int] = []
    chunk_dirs = {}
    for cid in range(len(chunks)):
        chunk_dirs[cid] = os.path.join(out_dir, "chunks", f"chunk-{cid0 + cid:05d}")
        m = validate_chunk(chunk_dirs[cid], fp)
        if m is not None:
            done_manifests[cid] = m
        else:
            if os.path.exists(chunk_dirs[cid]):
                shutil.rmtree(chunk_dirs[cid])
            os.makedirs(os.path.join(chunk_dirs[cid], "parts"), exist_ok=True)
            todo.append(cid)
    if not todo:
        return (
            [done_manifests[c] for c in range(len(chunks))],
            len(done_manifests),
            {"docs": 0, "tokens": 0},
        )

    dm_cols = list(cfg.keep_cols) or None
    if dm_cols is not None:
        dm_cols = [cfg.text_col] + ([cfg.id_col] if cfg.id_col else []) + dm_cols
        if cfg.field_col and cfg.field_col not in dm_cols:
            dm_cols.append(cfg.field_col)
    fn_chain = [
        (
            TokenizeBlob,
            (
                cfg.tokenizer, cfg.text_col, "docID", cfg.num_parts,
                max(cfg.salt_docs, 1), hot_ref, None, cfg.positions,
                cfg.field_col, cfg.head_tokens, cfg.style_head,
                cfg.term_vectors, cfg.style_levels,
            ),
        )
    ]
    n_specs = sum(len(chunks[c]) for c in todo)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    reserve = int(os.environ.get("INDEX_RAY_RESERVE", "0")) or max(1, cpus // 4)
    drain_cap = int(os.environ.get("INDEX_RAY_DRAIN_CAP", "0")) or cpus
    # one worker per CPU: the tokenize pool is physically oversubscribed by
    # the `reserve`-wide overlapped packs instead of shrunk (pure tokenize
    # scales ~linearly with workers on this host — measured 92% per-worker
    # at 8x — so idle-slot loss beats timeshare loss)
    nw = max(2, min(cpus, n_specs))
    bucket_mode = cfg.shuffle == "bucket"
    nb = (
        cfg.n_buckets or max(8, min(256, cfg.chunk_docs // 12000))
    ) if bucket_mode else 0
    n_pack = min(cpus, len(todo) * nb) if bucket_mode else 0
    workers, pack_workers = _session_pools(nw, n_pack)
    ray.get(
        [
            w.reconfigure.remote(
                dm_cols, "docID", cfg.id_col, fn_chain, cfg.batch_size
            )
            for w in workers
        ]
    )

    queue = [(cid, item) for cid in todo for item in _spec_items(chunks[cid])]
    rank = {cid: i for i, cid in enumerate(todo)}
    refs = {cid: [] for cid in todo}            # sort/hash: per-spec tables
    brefs = {cid: [[] for _ in range(nb)] for cid in todo}  # bucket mode
    remaining = {cid: len(chunks[cid]) for cid in todo}
    idle = list(workers)
    inflight: dict = {}
    pack_futs: dict = {}   # sort/hash: driver threads running Dataset jobs
    manifests = dict(done_manifests)

    # bucket mode: the persistent pack-actor pool.  num_cpus=0 + a
    # driver-side inflight cap: `reserve`-wide while tokenize streams (pack
    # steals only the reserved CPUs), full-width once tokenize drains.
    # FIFO rotation through the pool warms EVERY actor's arena during the
    # stream, so the drain runs entirely on recycled pages (fresh-page
    # faults are the wall on this host class — a cold process packs 5-20x
    # slower than a warm one).
    from collections import deque

    pack_idle = deque(pack_workers)
    pack_queue: deque = deque()   # (cid, bucket refs)
    pack_inflight: dict = {}      # fut -> (cid, actor)
    packs_left = {cid: nb for cid in todo}
    t_tok_done = None
    qi = 0
    head = 0  # rank of the oldest chunk whose phase A is incomplete
    window = max(1, cfg.pipeline_chunks)
    while qi < len(queue) or inflight or pack_queue or pack_inflight:
            while idle and qi < len(queue):
                cid, item = queue[qi]
                if rank[cid] > head + window:
                    break  # backpressure: stay close to the oldest chunk
                w = idle.pop()
                dm = os.path.join(chunk_dirs[cid], "docmap")
                if bucket_mode:
                    # nb bucket tables + one tiny int sentinel (num_returns
                    # >= 2 always, so rs is always a list — and the sentinel
                    # is the only ref the driver ever ray.gets)
                    rs = w.run.options(num_returns=nb + 1).remote(item, dm, nb)
                    for b in range(nb):
                        brefs[cid][b].append(rs[b])
                    fut = rs[nb]
                else:
                    fut = w.run.remote(item, dm)
                inflight[fut] = (cid, w)
                qi += 1
            tok_done = qi >= len(queue) and not inflight
            if tok_done and t_tok_done is None:
                t_tok_done = time.time()
            cap = drain_cap if tok_done else reserve
            while pack_queue and pack_idle and len(pack_inflight) < cap:
                pcid, bucket = pack_queue.popleft()
                pw = pack_idle.popleft()
                lex_dir = os.path.join(chunk_dirs[pcid], "lexicon")
                parts_dir = os.path.join(chunk_dirs[pcid], "parts")
                fut = pw.pack.remote(
                    parts_dir, lex_dir, cfg.max_block_postings,
                    cfg.positions, cfg.style_bits, *bucket,
                )
                pack_inflight[fut] = (pcid, pw)
            waitable = list(inflight) + list(pack_inflight)
            if not waitable:
                break  # only driver-thread pack_futs left
            ready, _ = ray.wait(waitable, num_returns=1)
            for fut in ready:
                if fut in pack_inflight:
                    pcid, pw = pack_inflight.pop(fut)
                    ray.get(fut)  # int result: surfaces pack task failures
                    pack_idle.append(pw)  # FIFO: rotate through the pool
                    packs_left[pcid] -= 1
                    if packs_left[pcid] == 0:
                        manifests[pcid] = _finish_chunk(
                            chunk_dirs[pcid], chunks[pcid], cid0 + pcid, cfg, {}
                        )
                    continue
                cid, w = inflight.pop(fut)
                idle.append(w)
                if bucket_mode:
                    # sentinel int: surfaces tokenize task failures loudly
                    # instead of writing a manifest over missing buckets
                    ray.get(fut)
                else:
                    refs[cid].append(fut)
                remaining[cid] -= 1
                if remaining[cid] == 0:
                    if bucket_mode:
                        # reduce side: one pack-actor call per bucket,
                        # queued the moment the chunk's last spec lands —
                        # runs on the reserved CPUs while later chunks
                        # tokenize, full-width once tokenize drains
                        os.makedirs(
                            os.path.join(chunk_dirs[cid], "lexicon"),
                            exist_ok=True,
                        )
                        for bucket in brefs.pop(cid):
                            pack_queue.append((cid, bucket))
                    else:
                        state = (
                            ray.data.from_arrow_refs(refs.pop(cid)),
                            chunk_dirs[cid],
                            os.path.join(chunk_dirs[cid], "parts"),
                            {},
                        )
                        pack_futs[cid] = ex.submit(
                            pack_chunk, state, chunks[cid], cid0 + cid, cfg
                        )
                    while head < len(todo) and remaining[todo[head]] == 0:
                        head += 1
    for cid, f in pack_futs.items():
        manifests[cid] = f.result()
    if manifests and todo:  # wall-clock attribution: tokenize stream vs drain
        any_m = manifests[todo[0]]
        any_m.setdefault("phase_seconds", {})["pack_drain"] = round(
            time.time() - (t_tok_done or time.time()), 3
        )
    built = {
        "docs": sum(manifests[c]["docs"] for c in todo),
        "tokens": sum(manifests[c]["tokens"] for c in todo),
    }
    return [manifests[c] for c in range(len(chunks))], len(done_manifests), built


def build_index(source, out_dir: str, cfg: BuildConfig | None = None) -> BuildResult:
    """Build the full index under ``out_dir``; resumable at chunk level.

    Ray Data's default 50% per-operator resource reservation starves the
    post-shuffle pack stage of a 5-operator pipeline (observed: ~3
    concurrent pack tasks on an 8-CPU cluster with CPUs idle); most CPUs
    must sit in the shared pool so whichever stage has work can take them.
    The ratio is lowered for the duration of the build and restored.
    """
    import ray.data as _rd
    from ray.data.context import ShuffleStrategy

    cfg = cfg or BuildConfig()
    ctx = _rd.DataContext.get_current()
    saved = {
        "op_resource_reservation_ratio": ctx.op_resource_reservation_ratio,
        "shuffle_strategy": ctx.shuffle_strategy,
        "max_hash_shuffle_aggregators": ctx.max_hash_shuffle_aggregators,
        "hash_shuffle_operator_actor_num_cpus_per_partition_override":
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
        "hash_aggregate_operator_actor_num_cpus_per_partition_override":
            ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override,
    }
    ctx.op_resource_reservation_ratio = min(saved["op_resource_reservation_ratio"], 0.2)
    if cfg.shuffle == "hash":
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # a few aggregator actors at num_cpus=0: always schedulable next to
        # the tokenize actor pool (their concat work is cheap; finalize
        # block builds parallelize across them); on a multi-node cluster
        # SPREAD still places them across nodes.
        ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0
        ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0
    try:
        return _build_index(source, out_dir, cfg)
    finally:
        for k, v in saved.items():
            setattr(ctx, k, v)


def append_index(source, out_dir: str, cfg: BuildConfig | None = None) -> BuildResult:
    """Incrementally ingest ``source`` into an existing index at ``out_dir``.

    The continuous-ingest path of a 100 TB deployment: new documents become
    NEW chunks (docIDs continue after the existing maximum — existing chunk
    files are immutable and never rewritten), then the global lexicon and
    corpus stats (N, avgdl) are re-merged so BM25 over old + new documents
    is exactly what a from-scratch build over the union would score.  The
    reference's analogue is its grow-only chunk sequence
    (``/root/reference/index.cpp:60-76``); here chunk k+1 can land from a
    different driver run entirely.

    Requirements: ``cfg`` must equal the config the index was built with
    (fingerprint-checked), and with metadata-derived docIDs the appended
    corpus must be a new fragment set (its docIDs are shifted past the
    existing range).  Idempotent per chunk: re-running the same append
    validates and skips completed chunks.
    """
    from dataclasses import replace as _dc_replace

    cfg = cfg or BuildConfig()
    stats = load_stats(out_dir)
    if stats.get("config_fingerprint") != cfg.fingerprint():
        raise ValueError(
            "append_index config does not match the existing index "
            "(fingerprint mismatch) — rebuild or pass the original BuildConfig"
        )
    old_chunks = stats.get("chunks", [])
    old_manifests = [
        read_json(
            manifest_path(os.path.join(out_dir, "chunks", f"chunk-{c['chunk']:05d}"))
        )
        for c in old_chunks
    ]
    for c, m in zip(old_chunks, old_manifests):
        if not m:
            raise FileNotFoundError(
                f"chunk-{c['chunk']:05d} is listed in stats.json but its "
                f"MANIFEST.json is missing or unreadable — run fsck_index "
                f"or rebuild that chunk before appending"
            )
    # idempotency: fragments already ingested by a previous build/append are
    # dropped (identity = absolute path + row group, the same lineage the
    # chunk manifests record) — re-running the same append is a no-op
    ingested = {
        (os.path.abspath(fr["path"]), fr["row_group"])
        for m in old_manifests
        for fr in m.get("input_fragments", [])
    }
    specs = [
        s
        for s in scan_fragments(source)
        if (os.path.abspath(s.path), s.row_group) not in ingested
    ]
    if not specs:
        n_docs = sum(m["docs"] for m in old_manifests)
        return BuildResult(
            out_dir=out_dir,
            n_docs=n_docs,
            total_tokens=sum(m["tokens"] for m in old_manifests),
            n_chunks=len(old_manifests),
            chunks_skipped=len(old_manifests),
            hot_terms=stats.get("hot_terms", []),
            phase_seconds={},
        )
    if cfg.id_col is None:
        doc_base = 1 + max(
            (c["doc_max"] for c in old_chunks if c.get("doc_max") is not None),
            default=-1,
        )
        specs = [_dc_replace(s, base_docid=s.base_docid + doc_base) for s in specs]
    chunks = split_chunks(specs, cfg.chunk_docs)
    cid0 = len(old_chunks)

    # reuse the existing hot-term set: salting must stay consistent with the
    # layout the census chose at build time (and appends skip the census)
    hot = stats.get("hot_terms", [])
    hot_ref = ray.put(frozenset(hot)) if hot else None

    import ray.data as _rd

    ctx = _rd.DataContext.get_current()
    saved_ratio = ctx.op_resource_reservation_ratio
    ctx.op_resource_reservation_ratio = min(saved_ratio, 0.2)
    phase_seconds: dict = {}
    t_run = time.time()
    try:
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.time()
        workers = max(1, min(cfg.pipeline_chunks, len(chunks)))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            new_manifests, skipped, built = _pipelined_build(
                chunks, out_dir, cfg, hot_ref, ex, cid0=cid0
            )
        phase_seconds["chunks_total"] = round(time.time() - t0, 3)
    finally:
        ctx.op_resource_reservation_ratio = saved_ratio

    # all manifests (old chunks are immutable — their manifests are on disk)
    manifests = old_manifests + new_manifests
    n_docs = sum(m["docs"] for m in manifests)
    phase_seconds.update(_finalize_index(out_dir, cfg, manifests, hot, n_docs))
    result = BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        total_tokens=sum(m["tokens"] for m in manifests),
        n_chunks=len(manifests),
        chunks_skipped=skipped,
        hot_terms=hot,
        phase_seconds=phase_seconds,
    )
    write_metrics(out_dir, "append", result, manifests, built, time.time() - t_run)
    return result


def write_metrics(
    out_dir: str,
    kind: str,
    result: BuildResult,
    manifests: list,
    built: dict,
    wall_s: float,
) -> dict:
    """Persist per-stage throughput metrics for this run to ``metrics.json``.

    The multi-node contract: a ``ray job submit`` build leaves a machine-
    readable record of what it processed and how fast — per-stage wall
    seconds plus docs/s, tokens/s and output MB/s over the documents this
    run actually built (resumed/skipped chunks are excluded from the
    throughput base, so an idempotent re-run reports ~0 docs, not a fake
    speedup).  One file per index dir, overwritten per run; the per-chunk
    breakdown lives in the chunk manifests."""
    out_bytes = sum(sum(m.get("files", {}).values()) for m in manifests)
    docs, tokens = built.get("docs", 0), built.get("tokens", 0)
    stages = {
        name: {
            "seconds": s,
            "docs_per_sec": round(docs / s, 1) if s else None,
        }
        for name, s in sorted(result.phase_seconds.items())
    }
    metrics = {
        "kind": kind,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "wall_seconds": round(wall_s, 3),
        "docs_built": docs,
        "tokens_built": tokens,
        "n_docs_total": result.n_docs,
        "n_chunks": result.n_chunks,
        "chunks_skipped": result.chunks_skipped,
        "output_bytes_total": out_bytes,
        "docs_per_sec": round(docs / wall_s, 1) if wall_s > 0 else None,
        "tokens_per_sec": round(tokens / wall_s, 1) if wall_s > 0 else None,
        "stages": stages,
    }
    write_json_atomic(os.path.join(out_dir, "metrics.json"), metrics)
    return metrics


def _build_index(source, out_dir: str, cfg: BuildConfig | None) -> BuildResult:
    cfg = cfg or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)
    specs = scan_fragments(source)
    n_docs = total_docs(specs)
    chunks = split_chunks(specs, cfg.chunk_docs)

    phase_seconds: dict = {}
    t_run = time.time()
    t0 = t_run
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

    # Streaming chunk pipeline: a persistent tokenize actor pool feeds
    # per-chunk shuffle+pack jobs (worker threads) as each chunk's last
    # spec completes — chunk k's exchange+pack overlaps chunk k+1's
    # tokenize, filling the CPUs `_pool` reserves and removing the
    # sort-barrier idle time a single fused pipeline pays per chunk.
    t0 = time.time()
    workers = max(1, min(cfg.pipeline_chunks, len(chunks)))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        manifests, skipped, built = _pipelined_build(chunks, out_dir, cfg, hot_ref, ex)
    for m in manifests:
        for k, v in m.get("phase_seconds", {}).items():
            phase_seconds[k] = round(phase_seconds.get(k, 0.0) + v, 3)
    phase_seconds["chunks_total"] = round(time.time() - t0, 3)
    t0 = time.time()

    phase_seconds.update(
        _finalize_index(out_dir, cfg, manifests, hot, n_docs)
    )
    total_tokens = sum(m["tokens"] for m in manifests)
    result = BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        total_tokens=total_tokens,
        n_chunks=len(chunks),
        chunks_skipped=skipped,
        hot_terms=hot,
        phase_seconds=phase_seconds,
    )
    write_metrics(out_dir, "build", result, manifests, built, time.time() - t_run)
    return result


def _finalize_index(out_dir: str, cfg: BuildConfig, manifests, hot, n_docs) -> dict:
    """Global epilogue: merge the per-chunk lexicons and write stats.json.

    Operates on the full manifest set (existing + appended chunks), so both
    the initial build and ``append_index`` produce one consistent global
    lexicon / N / avgdl."""
    t0 = time.time()
    import glob as _glob

    lex_files = [
        f
        for m in manifests
        for f in sorted(
            _glob.glob(
                os.path.join(
                    out_dir, "chunks", f"chunk-{m['chunk']:05d}", "lexicon", "*.parquet"
                )
            )
        )
    ]
    merge_lexicon(out_dir, lex_files)

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
        "style_head": cfg.style_head,
        "style_levels": list(cfg.style_levels) if cfg.style_levels else None,
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
    t1 = time.time()
    if cfg.reverse_lexicon and not os.path.isdir(
        os.path.join(out_dir, "lexicon_rev")
    ):
        # first commit of this index: write the reversed-term sidecar so
        # suffix wildcards are range probes from day one.  On later
        # commits merge_lexicon has already refreshed an existing sidecar.
        from .query import build_reverse_lexicon

        build_reverse_lexicon(out_dir)
    t2 = time.time()
    write_json_atomic(os.path.join(out_dir, "stats.json"), stats)
    from ..state.snapshots import snapshot_index

    snapshot_index(out_dir)  # publish this commit as a readable version
    return {
        "lexicon_merge": round(t1 - t0, 3),
        "reverse_lexicon": round(t2 - t1, 3),
    }


def merge_lexicon(out_dir: str, lex_files: list[str]) -> None:
    """Re-merge per-chunk (term, df, cf) partials into the global lexicon —
    driver-side when the vocabulary fits, a Ray groupby otherwise.  Shared
    by the build epilogue and compaction's tombstone purge."""
    glex_dir = os.path.join(out_dir, "lexicon")
    if os.path.exists(glex_dir):
        shutil.rmtree(glex_dir)
    # the reversed-term sidecar mirrors THIS lexicon: any rewrite (append,
    # purge, compaction) invalidates it — drop it first so no reader ever
    # probes a stale vocabulary, then (if one existed) REBUILD it against
    # the new lexicon at the end, preserving "sidecar present <=> sidecar
    # current" across every lexicon rewrite
    rev_dir = os.path.join(out_dir, "lexicon_rev")
    had_rev = os.path.isdir(rev_dir)
    if had_rev:
        shutil.rmtree(rev_dir)
    if not lex_files:  # zero-document corpus: an empty lexicon, not a crash
        os.makedirs(glex_dir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "cf": pa.array([], pa.int64()),
                }
            ),
            os.path.join(glex_dir, "lex-00000.parquet"),
        )
        if had_rev:
            from .query import build_reverse_lexicon

            build_reverse_lexicon(out_dir)
        return
    total_bytes = sum(os.path.getsize(f) for f in lex_files)
    if total_bytes < 256 << 20:
        # vocabulary fits on the driver: merge without a Ray job
        os.makedirs(glex_dir, exist_ok=True)
        t = pa.concat_tables(
            [pq.read_table(f, columns=["term", "df", "cf"]) for f in lex_files]
        )
        df = t.to_pandas().groupby("term", as_index=False)[["df", "cf"]].sum()
        df = df.sort_values("term").reset_index(drop=True)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(glex_dir, "part-00000.parquet"),
        )
    else:
        (
            ray.data.read_parquet(lex_files)
            .groupby("term", num_partitions=int(ray.cluster_resources().get("CPU", 8)))
            .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
            .sort("term")
            .write_parquet(glex_dir)
        )
    if had_rev:
        from .query import build_reverse_lexicon

        build_reverse_lexicon(out_dir)


def load_stats(out_dir: str) -> dict:
    from .compact import recover_swap  # deferred: compact imports build

    recover_swap(out_dir)  # heal any crash-interrupted compaction swap
    s = read_json(os.path.join(out_dir, "stats.json"))
    if s is None:
        raise FileNotFoundError(f"no stats.json under {out_dir} — build first")
    return s
