"""Compaction: merged chunks must serve bit-identical queries, shrink the
chunk count, merge under-full posting blocks, and stay append-compatible."""

import glob
import os
import time

import pytest

from conftest import TINY_CFG, TINY_DOCS, TINY_SEED
from index_ray.pipelines.build import BuildConfig, append_index, build_index, load_stats
from index_ray.pipelines.compact import compact_index
from index_ray.pipelines.query import BM25Searcher
from index_ray.sources.corpus import write_corpus

QUERIES = ["parse http request", "connection", "def return value", "binary tree"]


def _results(index_dir):
    s = BM25Searcher(index_dir)
    return [
        (q, s.search(q, k=10)["docID"].to_pylist(), s.search(q, k=10)["score"].to_pylist())
        for q in QUERIES
    ]


def test_compact_preserves_results(tmp_path):
    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=4)
    cfg = BuildConfig(**{**TINY_CFG, "chunk_docs": 50})  # force many chunks
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, cfg)
    before_chunks = len(load_stats(idx)["chunks"])
    assert before_chunks >= 3
    before = _results(idx)

    stats = compact_index(idx)
    assert len(stats["chunks"]) == 1
    assert len(glob.glob(os.path.join(idx, "chunks", "chunk-*"))) == 1
    assert _results(idx) == before  # bitwise-identical scores

    # stats totals unchanged
    s2 = load_stats(idx)
    assert s2["chunks"][0]["docs"] == TINY_DOCS
    assert s2["N"] == TINY_DOCS


def test_compact_merges_blocks_and_supports_append(tmp_path):
    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=4)
    files = sorted(glob.glob(str(corp / "*.parquet")))
    a_dir, b_dir = tmp_path / "a", tmp_path / "b"
    a_dir.mkdir(), b_dir.mkdir()
    import shutil

    assert len(files) >= 2
    for f in files[:-1]:
        shutil.copy(f, a_dir)
    shutil.copy(files[-1], b_dir)

    cfg = BuildConfig(**{**TINY_CFG, "chunk_docs": 40})
    idx = str(tmp_path / "idx")
    build_index(str(a_dir), idx, cfg)

    # per-term block rows shrink after compaction (under-full blocks merge)
    def n_rows():
        import pyarrow.parquet as pq

        return sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(idx, "chunks", "*", "parts", "*.parquet"))
        )

    rows_before = n_rows()
    compact_index(idx)
    assert n_rows() < rows_before

    # append still works on a compacted index, and re-append is a no-op
    res = append_index(str(b_dir), idx, cfg)
    assert res.n_docs == TINY_DOCS
    res2 = append_index(str(b_dir), idx, cfg)
    assert res2.n_docs == TINY_DOCS and res2.chunks_skipped >= 1

    # compacted+appended index == from-scratch build over the union
    full = str(tmp_path / "idx_full")
    build_index(str(corp), full, cfg)
    assert _results(idx) == _results(full)


def test_compact_positions_index(tmp_path):
    corp = tmp_path / "corp"
    write_corpus(str(corp), 120, seed=11, n_files=3)
    cfg = BuildConfig(**{**TINY_CFG, "chunk_docs": 40, "positions": True})
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, cfg)
    s = BM25Searcher(idx)
    before = s.phrase_many(["def return", "return valu"])
    assert any(len(t) > 0 for t in before)  # non-vacuous comparison
    compact_index(idx)
    s2 = BM25Searcher(idx)
    after = s2.phrase_many(["def return", "return valu"])
    for b, a in zip(before, after):
        assert a["docID"].to_pylist() == b["docID"].to_pylist()
        assert a["n_matches"].to_pylist() == b["n_matches"].to_pylist()


def test_delete_tombstones_then_purge(tmp_path):
    import numpy as np

    from index_ray.pipelines.compact import delete_docs, load_tombstones

    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=4)
    cfg = BuildConfig(**{**TINY_CFG, "chunk_docs": 50})
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, cfg)

    s_full = BM25Searcher(idx)
    big = {q: s_full.search(q, k=TINY_DOCS) for q in QUERIES}
    deleted = set(range(0, TINY_DOCS, 7))

    delete_docs(idx, sorted(deleted))
    assert len(load_tombstones(idx)) == len(deleted)

    # pre-compact: deleted docs barred, survivors keep IDENTICAL scores
    # (N/avgdl/idf unchanged until the purge)
    s_del = BM25Searcher(idx)
    for q in QUERIES:
        got = s_del.search(q, k=10)
        full = big[q]
        keep = [i for i, d in enumerate(full["docID"].to_pylist()) if d not in deleted]
        want_docs = [full["docID"][i].as_py() for i in keep][:10]
        want_scores = [full["score"][i].as_py() for i in keep][:10]
        assert got["docID"].to_pylist() == want_docs
        assert got["score"].to_pylist() == want_scores
        assert not (set(got["docID"].to_pylist()) & deleted)
        # prune losslessness holds over the allowed set
        nop = s_del.search(q, k=10, prune=False)
        assert got["docID"].to_pylist() == nop["docID"].to_pylist()
        assert got["score"].to_pylist() == nop["score"].to_pylist()

    # compact purges: must equal a from-scratch build over remaining docs
    stats = compact_index(idx)
    assert stats["N"] == TINY_DOCS - len(deleted)
    assert len(load_tombstones(idx)) == 0

    import pyarrow.parquet as pq

    from index_ray.sources.corpus import generate_corpus

    tbl = generate_corpus(TINY_DOCS, TINY_SEED)
    keep_mask = [i not in deleted for i in range(TINY_DOCS)]
    filt = tbl.filter(keep_mask).append_column(
        "doc_id",
        __import__("pyarrow").array(
            [i for i in range(TINY_DOCS) if i not in deleted],
            __import__("pyarrow").int64(),
        ),
    )
    fcorp = tmp_path / "fcorp"
    fcorp.mkdir()
    pq.write_table(filt, str(fcorp / "part-0.parquet"))
    fidx = str(tmp_path / "fidx")
    cfg_id = BuildConfig(**{**TINY_CFG, "chunk_docs": 50, "id_col": "doc_id"})
    build_index(str(fcorp), fidx, cfg_id)

    s_purged, s_fresh = BM25Searcher(idx), BM25Searcher(fidx)
    for q in QUERIES:
        a, b = s_purged.search(q, k=10), s_fresh.search(q, k=10)
        assert a["docID"].to_pylist() == b["docID"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()


def test_fsck_clean_and_detects_corruption(tmp_path):
    import pyarrow.parquet as pq

    from index_ray.state.fsck import fsck_index

    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=4)
    cfg = BuildConfig(**{**TINY_CFG, "chunk_docs": 100})
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, cfg)

    rep = fsck_index(idx).to_pandas()
    assert (rep["n_issues"] == 0).all(), rep[rep["n_issues"] > 0]

    # corrupt: truncate one part file -> size mismatch must be flagged
    part = sorted(glob.glob(os.path.join(idx, "chunks", "chunk-*", "parts", "*.parquet")))[0]
    data = open(part, "rb").read()
    with open(part, "wb") as f:
        f.write(data[: len(data) // 2])
    rep2 = fsck_index(idx).to_pandas()
    assert (rep2["n_issues"] > 0).any()
    assert rep2[rep2["n_issues"] > 0]["issues"].str.contains("size mismatch").any()

    # corrupt: doctor a docmap docID -> docmap/manifest disagreement flagged
    with open(part, "wb") as f:
        f.write(data)  # restore parts
    dm = sorted(glob.glob(os.path.join(idx, "chunks", "chunk-*", "docmap", "*.parquet")))[0]
    t = pq.read_table(dm)
    import pyarrow as pa_

    ids = t["docID"].to_numpy(zero_copy_only=False).copy()
    ids[0] = ids[1]  # duplicate docID
    t = t.set_column(t.schema.get_field_index("docID"), "docID", pa_.array(ids))
    pq.write_table(t, dm)
    rep3 = fsck_index(idx).to_pandas()
    flagged = rep3[rep3["n_issues"] > 0]["issues"].str.cat(sep="; ")
    assert "duplicate docIDs" in flagged or "size mismatch" in flagged


def test_compact_crash_recovery(tmp_path, monkeypatch):
    """A crash anywhere in the swap window must not lose the live index:
    recover_swap (run by every load_stats) rolls the layout back, queries
    are bit-identical, and re-running compact_index completes normally."""
    import index_ray.pipelines.compact as C
    from index_ray.pipelines.compact import delete_docs, recover_swap
    from index_ray.state.manifest import write_json_atomic

    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=4)
    cfg = BuildConfig(**{**TINY_CFG, "chunk_docs": 50})
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, cfg)
    delete_docs(idx, list(range(0, TINY_DOCS, 7)))  # purging compaction
    before = _results(idx)

    # crash just before the commit point (stats.json write): everything is
    # post-swap on disk — old dirs in trash, merged dirs placed — but
    # uncommitted
    def crash_on_stats(path, obj):
        if path.endswith("stats.json"):
            raise RuntimeError("simulated crash before commit")
        return write_json_atomic(path, obj)

    monkeypatch.setattr(C, "write_json_atomic", crash_on_stats)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_index(idx)
    monkeypatch.setattr(C, "write_json_atomic", write_json_atomic)

    assert os.path.exists(C.swap_journal_path(idx))
    # a FRESH uncommitted journal means the writer may still be alive:
    # opening the index refuses loudly instead of rolling back under it
    with pytest.raises(RuntimeError, match="in progress"):
        _results(idx)
    # backdate the journal past the liveness window = writer known dead
    old = time.time() - C.SWAP_LIVE_SECONDS - 10
    os.utime(C.swap_journal_path(idx), (old, old))
    # load_stats (via BM25Searcher) heals: pre-compaction layout + results
    assert _results(idx) == before
    assert not os.path.exists(C.swap_journal_path(idx))
    assert not os.path.exists(os.path.join(idx, "chunks", ".trash-swap"))
    assert glob.glob(os.path.join(idx, "chunks", "chunk-*"))

    # crash mid phase "trash" (only some old dirs renamed aside yet)
    chunks = sorted(glob.glob(os.path.join(idx, "chunks", "chunk-*")))
    assert len(chunks) >= 2
    trash = os.path.join(idx, "chunks", ".trash-swap")
    os.makedirs(trash)
    moved = os.path.basename(chunks[0])
    os.rename(chunks[0], os.path.join(trash, moved))
    write_json_atomic(
        C.swap_journal_path(idx),
        {
            "token": "deadbeef", "phase": "trash", "purged": True,
            "old": [os.path.basename(c) for c in chunks],
            "new": [[".compact-tmp-00000", "chunk-00000"]],
        },
    )
    old = time.time() - C.SWAP_LIVE_SECONDS - 10
    os.utime(C.swap_journal_path(idx), (old, old))
    recover_swap(idx)
    assert sorted(glob.glob(os.path.join(idx, "chunks", "chunk-*"))) == chunks
    assert _results(idx) == before

    # and a clean re-run completes + purges, bit-identical to from-scratch
    stats = compact_index(idx)
    assert "swap_token" in stats
    assert not os.path.exists(C.swap_journal_path(idx))
    assert not os.path.exists(os.path.join(idx, "tombstones"))
    keep_docs = [i for i in range(TINY_DOCS) if i % 7 != 0]
    assert load_stats(idx)["N"] == len(keep_docs)


def test_tombstones_survive_committed_swap_recovery(tmp_path, monkeypatch):
    """A tombstone written AFTER a purging compaction's commit point must
    survive recovery cleanup: roll-forward deletes only the journaled
    tombstone files the purge consumed, never later ones."""
    import shutil as _shutil

    import index_ray.pipelines.compact as C
    from index_ray.pipelines.compact import delete_docs, load_tombstones

    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=4)
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, BuildConfig(**{**TINY_CFG, "chunk_docs": 50}))
    delete_docs(idx, [3, 10])

    # crash AFTER the commit (stats.json written) but before cleanup:
    # simulate by failing the trash rmtree once
    calls = {"n": 0}
    real_rmtree = _shutil.rmtree

    def crash_once(path, *a, **kw):
        if ".trash-swap" in str(path) and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated crash after commit")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(C.shutil, "rmtree", crash_once)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_index(idx)
    monkeypatch.setattr(C.shutil, "rmtree", real_rmtree)
    assert os.path.exists(C.swap_journal_path(idx))  # committed, uncleaned

    # a NEW deletion lands while the journal is still on disk; its own
    # load_stats triggers roll-forward — the new tombstone must survive
    stats = delete_docs(idx, [20])
    assert not os.path.exists(C.swap_journal_path(idx))
    assert stats["n_tombstoned"] == 1
    assert list(load_tombstones(idx)) == [20]


def test_merge_indexes_bitwise_and_guards(tmp_path):
    """merge_indexes(A, B) over an even/odd doc_id split serves bitwise the
    single-build results; collisions and config mismatches are loud."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.compact import merge_indexes
    from index_ray.sources.corpus import generate_corpus

    texts = generate_corpus(200, TINY_SEED)["content"].to_pylist()
    full = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = BuildConfig(
        tokenizer="simple", text_col="text", id_col="doc_id",
        chunk_docs=60, num_parts=4, salt_docs=64,
    )
    paths = {}
    for name, mask in (
        ("full", np.ones(200, bool)),
        ("a", np.arange(200) % 2 == 0),
        ("b", np.arange(200) % 2 == 1),
    ):
        src = tmp_path / f"{name}_src"
        src.mkdir()
        pq.write_table(full.filter(pa.array(mask)), str(src / "documents.parquet"))
        idx = str(tmp_path / f"{name}_idx")
        build_index(str(src / "documents.parquet"), idx, cfg)
        paths[name] = idx

    merge_indexes(paths["a"], paths["b"])
    sf = load_stats(paths["full"])
    sm = load_stats(paths["a"])
    assert (sm["N"], sm["total_tokens"], sm["avgdl"]) == (
        sf["N"], sf["total_tokens"], sf["avgdl"],
    )
    assert _results(paths["a"]) == _results(paths["full"])  # bitwise

    # docID collision: the merged index now contains B's ids already
    with pytest.raises(ValueError, match="collision"):
        merge_indexes(paths["a"], paths["b"])

    # config mismatch is loud
    other = str(tmp_path / "other_idx")
    build_index(
        str(tmp_path / "b_src" / "documents.parquet"),
        other,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=60, num_parts=4, salt_docs=64, positions=True),
    )
    with pytest.raises(ValueError, match="fingerprint"):
        merge_indexes(paths["full"], other)


def test_merged_bm25_reruns_and_tombstone_count(tmp_path):
    """merged_bm25 must be rerunnable (stale _src dirs); merge_indexes
    carries tombstones into the merged stats count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.compact import delete_docs, merge_indexes
    from index_ray.pipelines.flagship import merged_bm25
    from index_ray.sources.corpus import generate_corpus

    sf = "/root/testdata/sf0.001"
    a = merged_bm25(sf)
    b = merged_bm25(sf)  # second run: no FileExistsError, same rows
    assert a.equals(b)

    texts = generate_corpus(60, TINY_SEED)["content"].to_pylist()
    cfg = BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                      chunk_docs=30, num_parts=2, salt_docs=64)
    idxs = {}
    for name, lo in (("x", 0), ("y", 30)):
        src = tmp_path / f"{name}s"
        src.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array(np.arange(lo, lo + 30, dtype=np.int64)),
                      "text": pa.array(texts[lo:lo + 30], pa.string())}),
            str(src / "documents.parquet"),
        )
        idx = str(tmp_path / f"{name}i")
        build_index(str(src / "documents.parquet"), idx, cfg)
        idxs[name] = idx
    delete_docs(idxs["y"], [31, 32])
    stats = merge_indexes(idxs["x"], idxs["y"])
    assert stats["n_tombstoned"] == 2


def test_upsert_replaces_by_identity(tmp_path):
    """Re-crawl upsert: changed documents (same path identity) replace the
    old versions — searches see the new content immediately and the old
    never; re-running the same upsert is a no-op; compaction purges."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from index_ray.pipelines.compact import (
        compact_index,
        load_tombstones,
        upsert_index,
    )
    from index_ray.pipelines.query import find_docs
    from index_ray.sources.corpus import generate_corpus

    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=3)
    cfg = BuildConfig(**TINY_CFG)
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, cfg)
    n0 = load_stats(idx)["N"]

    # re-crawl: docs 5..9 change content (same repo/path identity)
    full = generate_corpus(TINY_DOCS, TINY_SEED)
    sl = full.slice(5, 5)
    new_content = pa.array(
        [c + " zzupdated token" for c in sl["content"].to_pylist()]
    )
    recrawl = pa.table(
        {
            "repo": sl["repo"],
            "path": sl["path"],
            "commit": sl["commit"],
            "lang": sl["lang"],
            "content": new_content,
        }
    )
    rdir = tmp_path / "recrawl"
    rdir.mkdir()
    pq_.write_table(recrawl, str(rdir / "recrawl-0.parquet"))

    r = upsert_index(str(rdir), idx, cfg, key_col="path")
    assert r["n_replaced"] == 5
    old_ids = set(range(5, 10))
    assert set(load_tombstones(idx).tolist()) == old_ids

    # the new versions are searchable; the old docIDs are barred
    s = BM25Searcher(idx)
    got = s.search("zzupdated", k=10)["docID"].to_pylist()
    assert len(got) == 5 and all(d >= n0 for d in got)
    for q in QUERIES:
        assert not (set(s.search(q, k=200)["docID"].to_pylist()) & old_ids)
    # identity now resolves to both docmap rows until compaction; the
    # new row carries the updated sha
    rows = find_docs(idx, "path", [sl["path"][0].as_py()])
    assert rows.num_rows == 2

    # idempotent re-run: nothing new to replace, nothing re-appended
    r2 = upsert_index(str(rdir), idx, cfg, key_col="path")
    assert r2["n_replaced"] == 0
    assert set(load_tombstones(idx).tolist()) == old_ids

    # compaction purges the old versions physically
    compact_index(idx)
    assert load_stats(idx)["N"] == n0  # 200 - 5 + 5
    rows = find_docs(idx, "path", [sl["path"][0].as_py()])
    assert rows.num_rows == 1
    s2 = BM25Searcher(idx)
    assert len(s2.search("zzupdated", k=10)) == 5


def test_tiered_compaction_merges_only_small_runs(ray_session, tmp_path):
    """compact_tiered folds adjacent small chunks, passes big chunks
    through as hard links (same inode), and search stays bitwise."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from conftest import TINY_SEED
    from index_ray.pipelines.build import (
        BuildConfig,
        append_index,
        build_index,
        load_stats,
    )
    from index_ray.pipelines.compact import compact_tiered
    from index_ray.pipelines.query import BM25Searcher
    from index_ray.sources.corpus import generate_corpus

    texts = generate_corpus(320, TINY_SEED)["content"].to_pylist()

    def write(path, lo, hi):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                    "text": pa.array(texts[lo:hi], pa.string()),
                }
            ),
            str(path),
        )

    root = tmp_path / "tc"
    root.mkdir()
    write(root / "big.parquet", 0, 200)
    for i in range(3):
        write(root / f"s{i}.parquet", 200 + 40 * i, 240 + 40 * i)
    cfg = BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                      chunk_docs=400, num_parts=4, salt_docs=64, batch_size=64)
    idx = str(root / "idx")
    build_index(str(root / "big.parquet"), idx, cfg)       # 1 chunk, 200 docs
    for i in range(3):
        append_index(str(root / f"s{i}.parquet"), idx, cfg)  # 3 x 40-doc chunks
    assert len(load_stats(idx)["chunks"]) == 4
    before = [
        (q, BM25Searcher(idx).search(q, k=10)) for q in ["fast merge", "spark query"]
    ]
    big_part = sorted(
        (root / "idx" / "chunks" / "chunk-00000" / "parts").iterdir()
    )[0]
    ino_before = os.stat(big_part).st_ino

    compact_tiered(idx, small_docs=150, fanin=8)
    stats = load_stats(idx)
    assert len(stats["chunks"]) == 2  # big pass-through + one merged run
    docs = sorted(c["docs"] for c in stats["chunks"])
    assert docs == [120, 200]
    s2 = BM25Searcher(idx)
    for q, want in before:
        got = s2.search(q, k=10)
        assert got["docID"].to_pylist() == want["docID"].to_pylist()
        assert got["score"].to_pylist() == want["score"].to_pylist()
    # the big chunk's parts were hard-linked, not copied
    big_after = sorted(
        p
        for d in (root / "idx" / "chunks").iterdir()
        if d.name.startswith("chunk-")
        for p in (d / "parts").iterdir()
        if os.stat(p).st_ino == ino_before
    )
    assert big_after, "big chunk should carry over by hard link"


def test_compact_preserves_term_vectors(tmp_path):
    """Compacting a term_vectors=True index must carry the tvec/ forward
    index through the merge, and a purging compaction (plus the reader
    itself) must drop tombstoned docs' term vectors."""
    import pyarrow.parquet as _pq

    from index_ray.pipelines.compact import delete_docs
    from index_ray.pipelines.query import term_vectors

    corp = tmp_path / "corp"
    write_corpus(str(corp), TINY_DOCS, seed=TINY_SEED, n_files=4)
    cfg = BuildConfig(**{**TINY_CFG, "chunk_docs": 50}, term_vectors=True)
    idx = str(tmp_path / "idx")
    build_index(str(corp), idx, cfg)
    assert len(load_stats(idx)["chunks"]) >= 3
    probe = [0, 7, 42, TINY_DOCS - 1]
    before = term_vectors(idx, probe).to_pandas()
    before = before.sort_values(["docID", "term"]).reset_index(drop=True)
    assert len(before) > 0

    compact_index(idx)  # pure merge, no tombstones
    after = term_vectors(idx, probe).to_pandas()
    after = after.sort_values(["docID", "term"]).reset_index(drop=True)
    assert after.equals(before)

    # reader-level masking: a deleted doc's vectors disappear immediately
    delete_docs(idx, [probe[1]])
    masked = term_vectors(idx, probe).to_pandas()
    assert probe[1] not in set(masked["docID"])
    expected = before[before["docID"] != probe[1]].reset_index(drop=True)
    assert masked.sort_values(["docID", "term"]).reset_index(drop=True).equals(
        expected
    )

    # purging compaction: rows physically gone, the rest intact
    compact_index(idx)
    purged = term_vectors(idx, probe).to_pandas()
    assert purged.sort_values(["docID", "term"]).reset_index(drop=True).equals(
        expected
    )
