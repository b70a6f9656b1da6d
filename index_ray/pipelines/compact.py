"""Chunk compaction — the LSM-style companion to ``append_index``.

Every append creates new chunks; a long-running ingest therefore
accumulates many small chunks, each with its own docmap, lexicon partials
and under-full trailing posting blocks per term.  ``compact_index`` merges
a group of chunks into one: posting blocks of the same term are decoded,
concatenated in docID order and re-packed into full blocks (restoring the
skip/block-max density of a from-scratch build), docmaps and lexicon
partials are carried over, and the chunk list in ``stats.json`` is
rewritten.  Query results are bit-identical before and after (test-pinned)
— only the layout changes.

The reference's analogue is its dictionary-optimize/rewrite step over a
finished chunk (SURVEY.md §2 T2; ``/root/reference/index.h:286-328`` keeps
one mutable in-memory chunk precisely because it cannot do this).

Scale shape: one term-hash shuffle over the packed block rows (blobs move
once), re-pack vectorized per partition — the same cost class as the
original pack stage, run as an offline maintenance pass per chunk group.
Global stats (N, avgdl, lexicon) are unchanged by construction.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..stages.pack import (
    PACKED_POS_SCHEMA,
    PACKED_SCHEMA,
    pack_sorted,
    unpack_block,
    unpack_positions,
)
from ..state.manifest import (
    list_output_files,
    manifest_path,
    read_json,
    write_json_atomic,
)
from .build import load_stats, merge_lexicon

# an uncommitted swap journal younger than this is treated as a LIVE
# compaction in another process (single-writer design): opening the index
# raises instead of rolling the in-flight swap back under the writer
SWAP_LIVE_SECONDS = 120.0


def delete_docs(out_dir: str, doc_ids) -> dict:
    """Tombstone-delete documents from a built index (LSM delete marker).

    Appends ``doc_ids`` to ``out_dir/tombstones/``; the posting shards are
    immutable, so deletion is logical until the next ``compact_index``
    (which purges tombstoned postings/docmap rows and re-merges the
    lexicon + corpus stats).  Until then ``BM25Searcher`` bars tombstoned
    docs from every result while scoring with the PRE-delete N/avgdl/idf —
    the standard deferred-merge semantics.  Returns the updated stats.
    """
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    tomb_dir = os.path.join(out_dir, "tombstones")
    os.makedirs(tomb_dir, exist_ok=True)
    seq = len(glob.glob(os.path.join(tomb_dir, "*.parquet")))
    path = os.path.join(tomb_dir, f"tomb-{seq:05d}.parquet")
    tmp = path + f".{os.getpid()}.tmp"
    pq.write_table(pa.table({"docID": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, path)
    stats = load_stats(out_dir)
    stats["n_tombstoned"] = int(len(load_tombstones(out_dir)))
    write_json_atomic(os.path.join(out_dir, "stats.json"), stats)
    from ..state.snapshots import snapshot_index

    snapshot_index(out_dir)
    return stats


def upsert_index(
    source, out_dir: str, cfg=None, key_col: str = "path"
) -> dict:
    """Re-crawl upsert: replace documents whose ``key_col`` identity
    already exists — the reference crawler's FindUrl-then-reindex loop
    (``/root/reference/index.h:409``) as one idempotent operation:

    1. restrict to source fragments NOT yet ingested (chunk-manifest
       lineage — the same identity ``append_index`` uses);
    2. ``find_docs`` the incoming identities in the docmap and tombstone
       the surviving old docIDs (``delete_docs``; logical, immediate);
    3. ``append_index`` the new versions as fresh chunks.

    Searches see the new versions as soon as the append commits and the
    old versions never; the next ``compact_index`` purges the tombstoned
    postings physically.  Because step 2 only considers fragments that
    step 3 has not ingested, a re-run (or a crash between the steps and
    a retry) is a no-op / clean resume: the new versions are never
    self-tombstoned, and re-tombstoning an already-deleted doc is
    idempotent."""
    from ..sources.fragments import scan_fragments
    from ..state.manifest import manifest_path, read_json
    from .build import append_index
    from .query import find_docs

    stats = load_stats(out_dir)
    manifests = [
        read_json(
            manifest_path(os.path.join(out_dir, "chunks", f"chunk-{c['chunk']:05d}"))
        )
        for c in stats.get("chunks", [])
    ]
    ingested = {
        (os.path.abspath(fr["path"]), fr["row_group"])
        for m in manifests
        if m
        for fr in m.get("input_fragments", [])
    }
    new_specs = [
        s
        for s in scan_fragments(source)
        if (os.path.abspath(s.path), s.row_group) not in ingested
    ]
    n_replaced = 0
    if new_specs:
        keys: set = set()
        for s in new_specs:
            keys.update(
                pq.ParquetFile(s.path)
                .read_row_group(s.row_group, columns=[key_col])[key_col]
                .to_pylist()
            )
        old = find_docs(out_dir, key_col, sorted(keys))
        if old.num_rows:
            old_ids = np.unique(
                old["docID"].to_numpy(zero_copy_only=False)
            )
            already = load_tombstones(out_dir)
            live = old_ids[~np.isin(old_ids, already)]
            if len(live):
                delete_docs(out_dir, live)
            n_replaced = int(len(live))
    res = append_index(source, out_dir, cfg)
    return {
        "n_replaced": n_replaced,
        "n_docs": res.n_docs,
        "n_chunks": res.n_chunks,
        "chunks_skipped": res.chunks_skipped,
    }


def load_tombstones(out_dir: str, only_files: list[str] | None = None) -> np.ndarray:
    """Sorted unique tombstoned docIDs (empty array if none).

    ``only_files`` (basenames) restricts the read to the tombstone files a
    SNAPSHOT recorded — the time-travel view of the delete log."""
    files = sorted(glob.glob(os.path.join(out_dir, "tombstones", "*.parquet")))
    if only_files is not None:
        want = set(only_files)
        files = [f for f in files if os.path.basename(f) in want]
    if not files:
        return np.empty(0, np.int64)
    t = pa.concat_tables(pq.read_table(f) for f in files)
    return np.unique(t["docID"].to_numpy(zero_copy_only=False))


def swap_journal_path(out_dir: str) -> str:
    return os.path.join(out_dir, "chunks", ".swap-journal.json")


def recover_swap(out_dir: str) -> None:
    """Heal a compaction swap interrupted by a crash (cheap no-op normally).

    ``compact_index`` journals the swap before touching the live layout:
    phase "trash" renames every old chunk dir into ``chunks/.trash-swap/``;
    phase "place" renames the merged tmp dirs into the live namespace; the
    atomic ``stats.json`` rewrite carrying the journal's token is the
    COMMIT POINT.  On open (``load_stats`` calls this), a journal found on
    disk is rolled FORWARD past the commit (delete trash + journal) or
    BACK before it (restore old dirs; rename any placed merged dir back to
    its tmp name, where the next compaction wipes and rebuilds it).  The
    phase marker removes name ambiguity: in phase "trash" no merged dir
    was placed yet, in phase "place" every old dir is already in trash —
    so a ``chunk-NNNNN`` present in the live namespace is unambiguously
    old or new respectively."""
    jp = swap_journal_path(out_dir)
    if not os.path.exists(jp):
        return
    j = read_json(jp)
    chunks_root = os.path.join(out_dir, "chunks")
    trash = os.path.join(chunks_root, ".trash-swap")
    if not j:
        return  # unreadable journal: leave evidence in place
    stats = read_json(os.path.join(out_dir, "stats.json"))
    if stats and stats.get("swap_token") == j.get("token"):
        # committed: finish the cleanup the crash skipped — removing ONLY
        # the tombstone files the journal snapshot consumed, never ones
        # written after the commit (e.g. a delete_docs whose own
        # load_stats triggered this recovery)
        shutil.rmtree(trash, ignore_errors=True)
        if j.get("purged"):
            _remove_tomb_files(out_dir, j.get("tombs", []))
        os.remove(jp)
        return
    # Uncommitted journal: a crash mid-swap — unless the swap is still
    # LIVE in another process (this index is single-writer; a reader that
    # rolled back an in-flight swap would corrupt it).  Freshness is the
    # only signal available without a lock: refuse to open rather than
    # guess.
    age = time.time() - os.path.getmtime(jp)
    if age < SWAP_LIVE_SECONDS:
        raise RuntimeError(
            f"index at {out_dir} has a {age:.0f}s-old uncommitted compaction "
            f"journal — a compaction is likely in progress; retry after "
            f"{SWAP_LIVE_SECONDS}s or remove {jp} if the writer is known dead"
        )
    # not committed: roll back to the pre-swap layout
    if j.get("phase") == "place":
        for tmpname, dstname in j.get("new", []):
            dst = os.path.join(chunks_root, dstname)
            tmp = os.path.join(chunks_root, tmpname)
            if os.path.isdir(dst) and not os.path.isdir(tmp):
                os.rename(dst, tmp)
    for name in j.get("old", []):
        src = os.path.join(trash, name)
        dst = os.path.join(chunks_root, name)
        if os.path.isdir(src) and not os.path.isdir(dst):
            os.rename(src, dst)
    if j.get("purged"):
        # a purging compaction re-merges the global lexicon from the NEW
        # chunks before the commit; re-derive it from the restored layout
        lex_files = sorted(
            glob.glob(os.path.join(chunks_root, "chunk-*", "lexicon", "*.parquet"))
        )
        merge_lexicon(out_dir, lex_files)
    shutil.rmtree(trash, ignore_errors=True)
    os.remove(jp)


def _repack_rows(
    t: pa.Table,
    max_block_postings: int,
    positions: bool,
    tomb: np.ndarray | None = None,
    style: int = 0,
) -> pa.Table:
    """Decode one hash partition of packed block rows and re-pack per term.

    Rows are blocks (term, df, cf, postings, ...); all blocks of a term are
    in this partition (term-keyed shuffle).  Chunks cover disjoint docID
    ranges, so per term the blocks concatenate into one strictly-increasing
    posting stream once ordered by first docID.
    """
    if len(t) == 0:
        return (PACKED_POS_SCHEMA if positions else PACKED_SCHEMA).empty_table()
    t = t.combine_chunks()
    terms = t["term"].combine_chunks().dictionary_encode()
    codes_row = terms.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = terms.dictionary
    dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    post_col = t["postings"]
    pos_col = t["positions"] if positions else None

    docs_l, tfs_l, pos_l, first = [], [], [], np.empty(len(t), np.int64)
    for i in range(len(t)):
        docs, tfs = unpack_block(post_col[i].as_py(), int(dfs[i]))
        docs_l.append(docs)
        tfs_l.append(tfs)  # style-built: wire (tf << bits) | class, split below
        first[i] = docs[0] if len(docs) else -1
        if positions:
            pos_l.append(
                unpack_positions(
                    pos_col[i].as_py(), tfs >> int(style) if style else tfs
                )
            )

    order = np.lexsort((first, codes_row))
    doc = np.concatenate([docs_l[i] for i in order])
    tf = np.concatenate([tfs_l[i] for i in order])
    codes = np.repeat(codes_row[order], dfs[order])
    pos = np.concatenate([pos_l[i] for i in order]) if positions else None
    # block order by first docID yields a sorted stream only when chunks
    # cover DISJOINT docID ranges; an append may interleave ranges (LSM
    # ingest is id-order-free), so detect per-term disorder and fall back
    # to a full posting sort (positions re-gathered run-wise).  A true
    # duplicate (same term, same doc in two chunks) is corrupt input.
    same_term = codes[1:] == codes[:-1]
    if same_term.any() and not (doc[1:][same_term] > doc[:-1][same_term]).all():
        true_tf = (tf >> int(style)) if style else tf
        order2 = np.lexsort((doc, codes))
        dup = (codes[order2][1:] == codes[order2][:-1]) & (
            doc[order2][1:] == doc[order2][:-1]
        )
        if dup.any():
            raise ValueError(
                "duplicate (term, docID) posting across chunks — the index "
                "holds the same document twice; refusing to compact"
            )
        if pos is not None:
            from .dedup import _run_gather

            starts = np.concatenate([[0], np.cumsum(true_tf)[:-1]])
            pos = _run_gather(pos, starts[order2], true_tf[order2])
        doc, tf, codes = doc[order2], tf[order2], codes[order2]
    sbits = None
    if style:
        b = int(style)
        sbits = tf & ((1 << b) - 1)
        tf = tf >> b
    if tomb is not None and len(tomb):
        keep = ~np.isin(doc, tomb)
        if not keep.all():
            if pos is not None:
                pos = pos[np.repeat(keep, tf)]
            doc, tf, codes = doc[keep], tf[keep], codes[keep]
            if sbits is not None:
                sbits = sbits[keep]
    if len(doc) == 0:
        return (PACKED_POS_SCHEMA if positions else PACKED_SCHEMA).empty_table()
    salt = np.zeros(len(doc), np.int64)
    return pack_sorted(
        codes, dictionary, salt, doc, tf, max_block_postings, pos=pos,
        style=sbits, style_bits=int(style) or 1,
    )


def _tiered_groups(
    manifests: list[dict], small_docs: int, fanin: int
) -> list[list[dict]]:
    """Size-tiered grouping: merge only maximal runs (up to ``fanin``) of
    ADJACENT chunks each smaller than ``small_docs``; everything else is
    a singleton pass-through.  The LSM policy: repeated small appends
    fold together without ever rewriting the big established chunks."""
    groups: list[list[dict]] = []
    run: list[dict] = []

    def flush_run():
        nonlocal run
        while len(run) > 1:
            groups.append(run[:fanin])
            run = run[fanin:]
        if run:
            groups.append(run)
            run = []

    for m in manifests:
        if m["docs"] < small_docs:
            run.append(m)
            if len(run) == fanin:
                groups.append(run)
                run = []
        else:
            flush_run()
            groups.append([m])
    flush_run()
    return groups


def compact_tiered(
    out_dir: str,
    small_docs: int = 100_000,
    fanin: int = 8,
    max_block_postings: int = 1 << 17,
) -> dict:
    """Size-tiered compaction (the LSM/Lucene ``TieredMergePolicy``
    shape): merge only runs of adjacent chunks smaller than
    ``small_docs`` (at most ``fanin`` per merge); large chunks are
    carried over as hard links, never rewritten.  Same crash-safe swap
    as :func:`compact_index`."""
    return compact_index(
        out_dir,
        max_block_postings=max_block_postings,
        policy="tiered",
        small_docs=small_docs,
        fanin=fanin,
    )


def compact_index(
    out_dir: str,
    group_docs: int | None = None,
    max_block_postings: int = 1 << 17,
    policy: str = "full",
    small_docs: int = 100_000,
    fanin: int = 8,
) -> dict:
    """Merge the index's chunks into groups of ~``group_docs`` documents
    (default: all chunks into one), re-packing posting blocks.
    ``policy="tiered"`` switches the grouping to :func:`_tiered_groups`
    (merge small adjacent runs only — see :func:`compact_tiered`).

    Returns the updated stats dict.  The swap is crash-safe: old chunk
    dirs are renamed aside into ``chunks/.trash-swap/`` under a journal,
    the atomic ``stats.json`` rewrite is the commit point, and
    :func:`recover_swap` (run here and by every ``load_stats``) rolls an
    interrupted swap back to the pre-compaction layout or forward past
    the commit — no window loses the live index.
    """
    recover_swap(out_dir)
    stats = load_stats(out_dir)
    chunks = sorted(stats["chunks"], key=lambda c: c["chunk"])
    manifests = [
        read_json(manifest_path(os.path.join(out_dir, "chunks", f"chunk-{c['chunk']:05d}")))
        for c in chunks
    ]
    positions = bool(stats.get("positions"))
    style = (
        2 if stats.get("style_levels")
        else (1 if stats.get("style_head") else 0)
    )
    tomb = load_tombstones(out_dir)
    purging = len(tomb) > 0
    tomb_arr = tomb if purging else None
    # snapshot the tombstone FILES this purge consumes, at the same moment
    # their content is read: cleanup may delete exactly these — a tombstone
    # written later (e.g. delete_docs racing the swap window) must survive
    tomb_files = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(out_dir, "tombstones", "*.parquet"))
    )

    # group adjacent chunks (docID order == chunk order) up to group_docs;
    # tiered policy instead folds only small adjacent runs
    if policy == "tiered":
        groups = _tiered_groups(manifests, small_docs, fanin)
    else:
        groups = []
        cur: list[dict] = []
        cur_docs = 0
        for m in manifests:
            if cur and group_docs is not None and cur_docs + m["docs"] > group_docs:
                groups.append(cur)
                cur, cur_docs = [], 0
            cur.append(m)
            cur_docs += m["docs"]
        if cur:
            groups.append(cur)
    if not purging and all(len(g) == 1 for g in groups):
        return stats  # nothing to merge, nothing to purge

    t0 = time.time()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    tmp_dirs, new_manifests = [], []
    for gi, group in enumerate(groups):
        gdirs = [
            os.path.join(out_dir, "chunks", f"chunk-{m['chunk']:05d}") for m in group
        ]
        tmp = os.path.join(out_dir, "chunks", f".compact-tmp-{gi:05d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        parts_dir = os.path.join(tmp, "parts")
        os.makedirs(parts_dir)
        if len(group) == 1 and not purging:
            # singleton group: carry the chunk over untouched — hard links,
            # not copies (immutable files, same filesystem), so a tiered
            # compaction never rewrites nor re-copies the big chunks
            shutil.rmtree(tmp)
            shutil.copytree(gdirs[0], tmp, copy_function=os.link)
            os.remove(manifest_path(tmp))
        else:
            part_files = [
                f for d in gdirs for f in sorted(glob.glob(os.path.join(d, "parts", "*.parquet")))
            ]
            nparts = max(4, min(len(part_files), 4 * cpus))
            from ray.data.context import ShuffleStrategy

            ctx = ray.data.DataContext.get_current()
            saved = ctx.shuffle_strategy
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            tomb_ref = ray.put(tomb_arr) if purging else None

            def repack(t: pa.Table) -> pa.Table:
                tb = ray.get(tomb_ref) if tomb_ref is not None else None
                return _repack_rows(t, max_block_postings, positions, tb, style)

            try:
                (
                    ray.data.read_parquet(part_files)
                    .repartition(nparts, keys=["term"], sort=False)
                    .map_batches(
                        repack,
                        batch_size=None,
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    )
                    .write_parquet(parts_dir)
                )
            finally:
                ctx.shuffle_strategy = saved
            if purging:
                # the repacked parts ARE the (term, df, cf) partials —
                # regenerate the chunk lexicon from them post-purge
                lex_dir = os.path.join(tmp, "lexicon")
                os.makedirs(lex_dir, exist_ok=True)
                new_parts = sorted(glob.glob(os.path.join(parts_dir, "*.parquet")))
                lex_t = pa.concat_tables(
                    pq.read_table(f, columns=["term", "df", "cf"])
                    for f in new_parts
                ) if new_parts else pa.table(
                    {"term": pa.array([], pa.string()),
                     "df": pa.array([], pa.int64()),
                     "cf": pa.array([], pa.int64())}
                )
                pq.write_table(lex_t, os.path.join(lex_dir, "part-00000.parquet"))
            # docmap carries over (purge filters tombstoned rows); lexicon
            # partials carry over only when no purge happened
            import pyarrow.compute as pc

            # tvec (forward-index) sidecars are carried with the merge —
            # they are docID-keyed like docmap, so a purge filters their
            # tombstoned rows the same way; dropping them would break
            # term_vectors() after any compaction of a term_vectors build
            subs = ("docmap", "tvec") if purging else ("docmap", "lexicon", "tvec")
            for sub in subs:
                files = [
                    (m, f)
                    for m, d in zip(group, gdirs)
                    for f in sorted(glob.glob(os.path.join(d, sub, "*")))
                ]
                if not files:
                    continue  # e.g. no tvec sidecars (term_vectors=False)
                os.makedirs(os.path.join(tmp, sub), exist_ok=True)
                for m, f in files:
                    dst = os.path.join(
                        tmp, sub, f"c{m['chunk']:05d}-{os.path.basename(f)}"
                    )
                    if (
                        purging
                        and sub in ("docmap", "tvec")
                        and f.endswith(".parquet")
                    ):
                        dt = pq.read_table(f)
                        keep = pc.invert(
                            pc.is_in(
                                dt["docID"],
                                value_set=pa.array(tomb_arr, pa.int64()),
                            )
                        )
                        pq.write_table(dt.filter(keep), dst)
                    elif purging and sub == "docmap" and f.endswith(".stats.json"):
                        continue  # stale post-purge; manifests recomputed below
                    else:
                        shutil.copy(f, dst)
        nm = {
            "chunk": gi,
            "phase_seconds": {},
            "config_fingerprint": stats["config_fingerprint"],
            "input_fragments": [
                fr for m in group for fr in m.get("input_fragments", [])
            ],
            "docs": sum(m["docs"] for m in group),
            "tokens": sum(m["tokens"] for m in group),
            "doc_min": min(m["doc_min"] for m in group),
            "doc_max": max(m["doc_max"] for m in group),
        }
        if purging:
            dm_files = sorted(glob.glob(os.path.join(tmp, "docmap", "*.parquet")))
            dm = pa.concat_tables(
                pq.read_table(f, columns=["docID", "n_tokens"]) for f in dm_files
            )
            nm["docs"] = len(dm)
            nm["tokens"] = (
                int(pa.compute.sum(dm["n_tokens"]).as_py()) if len(dm) else 0
            )
            if len(dm):
                ids = dm["docID"].to_numpy(zero_copy_only=False)
                nm["doc_min"], nm["doc_max"] = int(ids.min()), int(ids.max())
        new_manifests.append(nm)
        tmp_dirs.append(tmp)

    # crash-safe swap (see recover_swap): journal -> old dirs into trash
    # (phase "trash") -> merged dirs placed (phase "place") -> stats.json
    # with the journal token is the commit -> cleanup
    chunks_root = os.path.join(out_dir, "chunks")
    trash = os.path.join(chunks_root, ".trash-swap")
    token = os.urandom(8).hex()
    journal = {
        "token": token,
        "phase": "trash",
        "purged": purging,
        "tombs": tomb_files if purging else [],
        "old": [f"chunk-{m['chunk']:05d}" for m in manifests],
        "new": [
            [os.path.basename(tmp), f"chunk-{gi:05d}"]
            for gi, tmp in enumerate(tmp_dirs)
        ],
    }
    write_json_atomic(swap_journal_path(out_dir), journal)
    os.makedirs(trash, exist_ok=True)
    for name in journal["old"]:
        os.rename(os.path.join(chunks_root, name), os.path.join(trash, name))
    journal["phase"] = "place"
    write_json_atomic(swap_journal_path(out_dir), journal)
    for (tmpname, dstname), nm in zip(journal["new"], new_manifests):
        dst = os.path.join(chunks_root, dstname)
        os.rename(os.path.join(chunks_root, tmpname), dst)
        nm["files"] = list_output_files(dst)
        write_json_atomic(manifest_path(dst), nm)

    stats["chunks"] = [
        {
            "chunk": nm["chunk"],
            "docs": nm["docs"],
            "doc_min": nm["doc_min"],
            "doc_max": nm["doc_max"],
        }
        for nm in new_manifests
    ]
    if purging:
        # tombstones are now physically purged: recompute corpus stats and
        # re-merge the global lexicon so BM25 == a from-scratch build over
        # the remaining documents
        n_docs = sum(nm["docs"] for nm in new_manifests)
        total_tokens = sum(nm["tokens"] for nm in new_manifests)
        stats["N"] = n_docs
        stats["total_tokens"] = total_tokens
        stats["avgdl"] = (total_tokens / n_docs) if n_docs else 0.0
        stats.pop("n_tombstoned", None)
        lex_files = [
            f
            for nm in new_manifests
            for f in sorted(
                glob.glob(
                    os.path.join(
                        out_dir, "chunks", f"chunk-{nm['chunk']:05d}", "lexicon", "*.parquet"
                    )
                )
            )
        ]
        merge_lexicon(out_dir, lex_files)
    stats["compacted_seconds"] = round(time.time() - t0, 3)
    stats["swap_token"] = token  # commit point for recover_swap
    write_json_atomic(os.path.join(out_dir, "stats.json"), stats)
    shutil.rmtree(trash, ignore_errors=True)
    if purging:
        _remove_tomb_files(out_dir, tomb_files)
    os.remove(swap_journal_path(out_dir))
    from ..state.snapshots import prune_invalid_snapshots, snapshot_index

    prune_invalid_snapshots(out_dir)  # rewritten chunks retire old versions
    snapshot_index(out_dir)
    return stats


def _remove_tomb_files(out_dir: str, names: list[str]) -> None:
    """Delete exactly the journaled tombstone files a purge consumed; a
    tombstone written after the snapshot (delete_docs racing the swap)
    survives to be purged by the next compaction."""
    tomb_dir = os.path.join(out_dir, "tombstones")
    for name in names:
        try:
            os.remove(os.path.join(tomb_dir, name))
        except FileNotFoundError:
            pass
    try:  # drop the dir only when nothing new arrived
        os.rmdir(tomb_dir)
    except OSError:
        pass


def merge_indexes(dst: str, src: str) -> dict:
    """Adopt another index's chunks into this one — the Lucene
    ``addIndexes`` maintenance op, share-nothing style.

    Both indexes must share a config fingerprint, and their docID spaces
    must be disjoint: chunk pairs whose [doc_min, doc_max] ranges overlap
    get their docmap docID columns intersected, and any collision is a
    loud error (ranges that don't overlap need no reads at all, so two
    partition indexes over id-ranged corpora merge with zero data reads).
    Chunk dirs are adopted via hard links where the filesystem allows
    (copy fallback) and renumbered; src tombstones carry over (docIDs are
    global); the global lexicon/stats re-merge from the combined per-chunk
    partials — the same epilogue a build/append runs.  Because BM25 scores
    depend only on the integer-exact global stats (N, total_tokens -> avgdl,
    merged df) and per-(term, doc) contributions accumulate in query-term
    order regardless of chunk layout, search over the merged index is
    BITWISE the single-build result over the union corpus (test-pinned;
    the physical counterpart of query.FederatedBM25's logical merge).
    On shared cluster storage the adoption is metadata-only (link/rename);
    nothing re-packs and nothing re-shuffles — run ``compact_index``
    afterwards if chunk sizes matter more than merge latency.
    """
    import itertools

    recover_swap(dst)
    recover_swap(src)
    sd, ss = load_stats(dst), load_stats(src)
    if sd.get("config_fingerprint") != ss.get("config_fingerprint"):
        raise ValueError(
            "merge_indexes: config fingerprints differ — the indexes were "
            "built with different BuildConfigs"
        )

    dchunks = sorted(sd["chunks"], key=lambda c: c["chunk"])
    schunks = sorted(ss["chunks"], key=lambda c: c["chunk"])

    def _chunk_docids(root: str, cid: int) -> np.ndarray:
        files = sorted(
            glob.glob(
                os.path.join(root, "chunks", f"chunk-{cid:05d}", "docmap", "*.parquet")
            )
        )
        if not files:
            return np.empty(0, np.int64)
        return np.concatenate(
            [
                pq.read_table(f, columns=["docID"])["docID"].to_numpy(
                    zero_copy_only=False
                )
                for f in files
            ]
        )

    cache: dict = {}
    for a, b in itertools.product(dchunks, schunks):
        if a.get("doc_min") is None or b.get("doc_min") is None:
            continue
        if a["doc_min"] <= b["doc_max"] and b["doc_min"] <= a["doc_max"]:
            ka, kb = ("d", a["chunk"]), ("s", b["chunk"])
            if ka not in cache:
                cache[ka] = _chunk_docids(dst, a["chunk"])
            if kb not in cache:
                cache[kb] = _chunk_docids(src, b["chunk"])
            both = np.intersect1d(cache[ka], cache[kb])
            if len(both):
                raise ValueError(
                    f"merge_indexes: docID collision (e.g. {int(both[0])}) "
                    f"between dst chunk {a['chunk']} and src chunk {b['chunk']}"
                )

    cid0 = 1 + max((c["chunk"] for c in dchunks), default=-1)
    new_manifests = []
    for i, c in enumerate(schunks):
        sdir = os.path.join(src, "chunks", f"chunk-{c['chunk']:05d}")
        ddir = os.path.join(dst, "chunks", f"chunk-{cid0 + i:05d}")
        if os.path.exists(ddir):
            shutil.rmtree(ddir)
        try:
            shutil.copytree(sdir, ddir, copy_function=os.link)
        except OSError:
            shutil.rmtree(ddir, ignore_errors=True)
            shutil.copytree(sdir, ddir)
        m = read_json(manifest_path(ddir))
        m["chunk"] = cid0 + i
        write_json_atomic(manifest_path(ddir), m)  # new inode: src untouched
        new_manifests.append(m)

    tdir = os.path.join(dst, "tombstones")
    for f in sorted(glob.glob(os.path.join(src, "tombstones", "*.parquet"))):
        os.makedirs(tdir, exist_ok=True)
        target = os.path.join(tdir, f"merged-{cid0:05d}-{os.path.basename(f)}")
        if not os.path.exists(target):
            try:
                os.link(f, target)
            except OSError:
                shutil.copy2(f, target)

    manifests = [
        read_json(
            manifest_path(os.path.join(dst, "chunks", f"chunk-{c['chunk']:05d}"))
        )
        for c in dchunks
    ] + new_manifests
    lex_files = [
        f
        for m in manifests
        for f in sorted(
            glob.glob(
                os.path.join(
                    dst, "chunks", f"chunk-{m['chunk']:05d}", "lexicon", "*.parquet"
                )
            )
        )
    ]
    merge_lexicon(dst, lex_files)
    n_docs = sum(m["docs"] for m in manifests)
    total_tokens = sum(m["tokens"] for m in manifests)
    stats = {
        **sd,
        "N": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "n_tombstoned": int(len(load_tombstones(dst))),  # src's carried over
        "hot_terms": sorted(set(sd.get("hot_terms", [])) | set(ss.get("hot_terms", []))),
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
    write_json_atomic(os.path.join(dst, "stats.json"), stats)
    from ..state.snapshots import prune_invalid_snapshots, snapshot_index

    prune_invalid_snapshots(dst)  # adopted/renumbered chunks retire old versions
    snapshot_index(dst)
    return stats


def diff_snapshots(
    out_dir: str, v_from: int, v_to: int, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Iceberg-style snapshot diff: which documents became visible
    ('added') or stopped being visible ('removed') between two snapshots
    of the same index (``state/snapshots.py``).

    Visibility(v) = union of v's chunk docmaps minus v's tombstones.
    Only chunks whose CONTENT fingerprint differs between the two
    versions are scanned (a chunk common to both can only change
    visibility through tombstones, handled via the small tombstone-delta
    sets with predicate-pushdown docmap probes) — the diff streams
    O(changed chunks + tombstone delta), never O(index).

    Output Dataset: (<id_col>, change) with change in {'added',
    'removed'}; a doc that appears AND disappears nets to zero rows.
    """
    import pyarrow.dataset as pads

    from ..state.snapshots import load_snapshot
    from ray.data.aggregate import Sum

    mf = load_snapshot(out_dir, v_from)
    mt = load_snapshot(out_dir, v_to)
    fp_f = {int(k): v for k, v in mf.get("chunk_fps", {}).items()}
    fp_t = {int(k): v for k, v in mt.get("chunk_fps", {}).items()}
    tomb_f = load_tombstones(out_dir, mf.get("tombstone_files", []))
    tomb_t = load_tombstones(out_dir, mt.get("tombstone_files", []))
    only_f = sorted(c for c in fp_f if fp_t.get(c) != fp_f[c])
    only_t = sorted(c for c in fp_t if fp_f.get(c) != fp_t[c])
    common = sorted(c for c in fp_t if fp_f.get(c) == fp_t[c])

    def dm_files(chunks: list[int]) -> list[str]:
        out: list[str] = []
        for c in chunks:
            out += sorted(
                glob.glob(
                    os.path.join(
                        out_dir, "chunks", f"chunk-{c:05d}", "docmap", "*.parquet"
                    )
                )
            )
        return out

    schema = pa.schema([(id_col, pa.int64()), ("delta", pa.int64())])
    parts: list[ray.data.Dataset] = []

    def chunk_side(files: list[str], tombs: np.ndarray, delta: int):
        tomb_ref = ray.put(np.asarray(tombs, np.int64))

        def tag(batch: pa.Table) -> pa.Table:
            tt = ray.get(tomb_ref)
            ids = batch["docID"].to_numpy(zero_copy_only=False)
            b = batch.filter(pa.array(~np.isin(ids, tt)))
            return pa.table(
                {
                    id_col: b[id_col],
                    "delta": pa.array(np.full(b.num_rows, delta, np.int64)),
                }
            )

        cols = ["docID"] + ([id_col] if id_col != "docID" else [])
        parts.append(
            ray.data.read_parquet(files, columns=cols).map_batches(
                tag, batch_format="pyarrow"
            )
        )

    if only_t:
        chunk_side(dm_files(only_t), tomb_t, +1)
    if only_f:
        chunk_side(dm_files(only_f), tomb_f, -1)

    # tombstone-only visibility changes within chunks common to both
    # versions: probe just those docIDs (predicate pushdown)
    cfiles = dm_files(common)
    for ids, delta in (
        (np.setdiff1d(tomb_t, tomb_f), -1),
        (np.setdiff1d(tomb_f, tomb_t), +1),
    ):
        if len(ids) and cfiles:
            probe = pads.dataset(cfiles).to_table(
                filter=pads.field("docID").isin(ids.tolist()),
                columns=["docID"] + ([id_col] if id_col != "docID" else []),
            )
            parts.append(
                ray.data.from_arrow(
                    pa.table(
                        {
                            id_col: probe[id_col],
                            "delta": pa.array(
                                np.full(probe.num_rows, delta, np.int64)
                            ),
                        }
                    )
                )
            )

    if not parts:
        return ray.data.from_arrow(
            pa.schema([(id_col, pa.int64()), ("change", pa.string())]).empty_table()
        )
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    net = ds.groupby(id_col).aggregate(Sum("delta", alias_name="net"))

    def label(batch: pa.Table) -> pa.Table:
        n = batch["net"].to_numpy(zero_copy_only=False)
        keep = n != 0
        b = batch.filter(pa.array(keep))
        nn = b["net"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "change": pa.array(
                    np.where(nn > 0, "added", "removed"), pa.string()
                ),
            }
        )

    return net.map_batches(label, batch_format="pyarrow")
