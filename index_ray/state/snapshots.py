"""Snapshot versioning: time-travel reads over the index lifecycle.

Every commit point (build, append, delete, compact, merge) publishes an
immutable snapshot under ``<index>/snapshots/v{N:05d}/``:

- ``SNAPSHOT.json`` — the full ``stats.json`` blob at commit time (chunk
  list, N, avgdl, config) plus the names of the tombstone files visible
  at that commit;
- ``lexicon/`` — HARD LINKS to the global lexicon parquet of that
  version (appends/compactions rewrite ``<index>/lexicon/`` with fresh
  inodes, so a link keeps the old vocabulary alive at zero copy cost).

A snapshot is self-sufficient as long as the chunk dirs it lists still
exist.  Chunks are append-only across build/append/delete, so every
snapshot stays readable until a COMPACTION physically rewrites chunks —
at which point :func:`prune_invalid_snapshots` retires the snapshots
whose chunks are gone (the Iceberg "expire snapshots on rewrite"
semantics, without a retention window: this engine keeps storage
minimal and the caller compacts deliberately).

``BM25Searcher(index_dir, snapshot=N)`` then reads AS OF that commit:
frozen N/avgdl/df (the lexicon link), the chunk subset, and only the
tombstones that existed then — so a doc deleted later is still
retrievable at the earlier version, bitwise-identically to a fresh
build over that version's corpus (pinned by ``time_travel_bm25``'s SQL
oracle and ``tests/test_snapshots.py``).

Reference parity: the reference's only versioning is "completed chunk
files survive a restart" (``index.cpp:60-76``); snapshots extend that
lineage idea to the whole-index commit level.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

from .manifest import read_json, write_json_atomic


def snapshots_root(out_dir: str) -> str:
    return os.path.join(out_dir, "snapshots")


def _chunk_fp(out_dir: str, chunk: int) -> str | None:
    """Content identity of a chunk: hash of its MANIFEST.json bytes.
    Chunk NAMES recur (a compaction's merged output may reuse
    ``chunk-00000``), so snapshot validation must bind to content — the
    manifest carries lineage, row counts and output file sizes, which a
    rewrite always changes."""
    try:
        with open(os.path.join(out_dir, "chunks", f"chunk-{chunk:05d}",
                               "MANIFEST.json"), "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None


def _snap_dir(out_dir: str, version: int) -> str:
    return os.path.join(snapshots_root(out_dir), f"v{version:05d}")


def list_snapshots(out_dir: str) -> list[dict]:
    """Manifests of all readable snapshots, ascending by version."""
    out = []
    for d in sorted(glob.glob(os.path.join(snapshots_root(out_dir), "v*"))):
        m = read_json(os.path.join(d, "SNAPSHOT.json"))
        if m is not None:
            out.append(m)
    return out


def snapshot_index(out_dir: str) -> int:
    """Publish the index's CURRENT state as the next snapshot version and
    return it.  Idempotent: if the latest snapshot already equals the
    current state (same stats blob, same tombstone files), its version is
    returned and nothing is written — a resumed/no-op build does not churn
    versions."""
    from ..pipelines.build import load_stats

    stats = load_stats(out_dir)
    tomb = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(out_dir, "tombstones", "*.parquet"))
    )
    chunk_fps = {
        str(c["chunk"]): _chunk_fp(out_dir, int(c["chunk"]))
        for c in stats["chunks"]
    }
    existing = list_snapshots(out_dir)
    if existing:
        last = existing[-1]
        if (
            last.get("stats") == stats
            and last.get("tombstone_files") == tomb
            and last.get("chunk_fps") == chunk_fps
        ):
            return int(last["version"])
    root = snapshots_root(out_dir)
    os.makedirs(root, exist_ok=True)
    # versions are MONOTONIC across prunes: a retired number never recurs
    # (readers cache version handles; reuse would alias different states)
    counter = read_json(os.path.join(root, "COUNTER.json")) or {"last": 0}
    n = max(
        int(counter["last"]),
        int(existing[-1]["version"]) if existing else 0,
    ) + 1
    write_json_atomic(os.path.join(root, "COUNTER.json"), {"last": n})
    tmp = os.path.join(root, f".v{n:05d}.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "lexicon"))
    for f in sorted(glob.glob(os.path.join(out_dir, "lexicon", "*.parquet"))):
        os.link(f, os.path.join(tmp, "lexicon", os.path.basename(f)))
    write_json_atomic(
        os.path.join(tmp, "SNAPSHOT.json"),
        {
            "version": n,
            "stats": stats,
            "tombstone_files": tomb,
            "chunk_fps": chunk_fps,
        },
    )
    os.rename(tmp, _snap_dir(out_dir, n))  # atomic publish
    return n


def load_snapshot(out_dir: str, version: int) -> dict:
    """The snapshot manifest, validated: every chunk it lists must still
    exist on disk (compaction retires snapshots; a clear error beats a
    partial read)."""
    m = read_json(os.path.join(_snap_dir(out_dir, version), "SNAPSHOT.json"))
    if m is None:
        known = [s["version"] for s in list_snapshots(out_dir)]
        raise FileNotFoundError(
            f"no snapshot v{version} under {out_dir} (available: {known})"
        )
    fps = m.get("chunk_fps", {})
    missing = [
        c["chunk"]
        for c in m["stats"]["chunks"]
        if _chunk_fp(out_dir, int(c["chunk"])) != fps.get(str(c["chunk"]))
    ]
    if missing:
        raise FileNotFoundError(
            f"snapshot v{version} references rewritten or compacted-away "
            f"chunks {missing}; it was retired by a compaction"
        )
    for t in m.get("tombstone_files", []):
        if not os.path.exists(os.path.join(out_dir, "tombstones", t)):
            raise FileNotFoundError(
                f"snapshot v{version} references consumed tombstone file {t}; "
                "it was retired by a compaction"
            )
    return m


def snapshot_lexicon_dir(out_dir: str, version: int) -> str:
    return os.path.join(_snap_dir(out_dir, version), "lexicon")


def prune_invalid_snapshots(out_dir: str) -> list[int]:
    """Remove snapshots whose chunk dirs or tombstone files no longer
    exist (called after a compaction/merge rewrites the physical layout).
    Returns the retired version numbers."""
    retired = []
    for m in list_snapshots(out_dir):
        v = int(m["version"])
        fps = m.get("chunk_fps", {})
        ok = all(
            _chunk_fp(out_dir, int(c["chunk"])) == fps.get(str(c["chunk"]))
            for c in m["stats"]["chunks"]
        ) and all(
            os.path.exists(os.path.join(out_dir, "tombstones", t))
            for t in m.get("tombstone_files", [])
        )
        if not ok:
            shutil.rmtree(_snap_dir(out_dir, v), ignore_errors=True)
            retired.append(v)
    return retired


def rollback_to_snapshot(out_dir: str, version: int) -> dict:
    """ROLL BACK the live index to a published snapshot (the Iceberg
    ``rollback_to_snapshot``): after this, plain readers (which glob the
    live chunk namespace) see exactly what ``BM25Searcher(...,
    snapshot=version)`` sees — the undo for a bad ingest or delete.

    Steps, all idempotent so a crashed rollback is completed by simply
    re-running it (between chunk removal and the stats rewrite the live
    index is unreadable — rollback is re-runnable, not crash-atomic):

    1. validate the target snapshot (its chunks must still exist);
    2. delete tombstone files the snapshot does not record;
    3. delete chunk dirs the snapshot does not list (newer appends);
    4. restore the merged lexicon from the snapshot's hard-linked copy;
    5. atomically write the snapshot's stats.json (the commit point);
    6. prune snapshots that referenced the removed state.

    Returns the restored stats dict.
    """
    m = load_snapshot(out_dir, version)
    keep_chunks = {int(c["chunk"]) for c in m["stats"]["chunks"]}
    keep_tomb = set(m.get("tombstone_files", []))
    for p in glob.glob(os.path.join(out_dir, "tombstones", "*.parquet")):
        if os.path.basename(p) not in keep_tomb:
            os.unlink(p)
    for d in glob.glob(os.path.join(out_dir, "chunks", "chunk-*")):
        try:
            num = int(os.path.basename(d).split("-")[1])
        except (IndexError, ValueError):
            continue
        if num not in keep_chunks:
            shutil.rmtree(d, ignore_errors=True)
    src = snapshot_lexicon_dir(out_dir, version)
    tmp = os.path.join(out_dir, ".lexicon-rollback-tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    for f in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        os.link(f, os.path.join(tmp, os.path.basename(f)))
    live = os.path.join(out_dir, "lexicon")
    old = os.path.join(out_dir, ".lexicon-old")
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old, ignore_errors=True)
    # The reverse-lexicon sidecar indexes the lexicon it was built FROM;
    # after the swap it may describe a different vocabulary (merge_lexicon
    # drops it on every rewrite for the same reason).  Remove it so suffix
    # wildcards fall back to the exact sweep until build_reverse_lexicon
    # re-runs against the restored lexicon.
    shutil.rmtree(os.path.join(out_dir, "lexicon_rev"), ignore_errors=True)
    from .manifest import write_json_atomic  # commit point

    write_json_atomic(os.path.join(out_dir, "stats.json"), m["stats"])
    prune_invalid_snapshots(out_dir)
    return m["stats"]


def expire_snapshots(out_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: delete all but the newest ``keep_last`` snapshots (the
    Iceberg ``expire_snapshots``).  Never touches live data — only the
    snapshot dirs (whose lexicon files are hard links; chunk data is
    shared with the live index and stays).  Returns retired versions."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snaps = list_snapshots(out_dir)
    retired = []
    for m in snaps[:-keep_last] if len(snaps) > keep_last else []:
        v = int(m["version"])
        shutil.rmtree(_snap_dir(out_dir, v), ignore_errors=True)
        retired.append(v)
    return retired
