"""Compaction: merged chunks must serve bit-identical queries, shrink the
chunk count, merge under-full posting blocks, and stay append-compatible."""

import glob
import os

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
