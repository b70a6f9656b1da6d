"""Incremental ingest: append_index must equal a from-scratch build over
the union — identical docIDs, bitwise-identical BM25 scores, consistent
global stats — and stay idempotent / config-guarded."""

import glob
import shutil

import pytest

from conftest import TINY_CFG
from index_ray.pipelines.build import BuildConfig, append_index, build_index
from index_ray.pipelines.query import BM25Searcher
from index_ray.sources.corpus import write_corpus

QUERIES = ["parse http request", "connection", "def return value", "binary tree"]


@pytest.fixture(scope="module")
def split_corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("append_corpora")
    all_dir = root / "all"
    write_corpus(str(all_dir), 200, seed=7, n_files=4)
    files = sorted(glob.glob(str(all_dir / "*.parquet")))
    a_dir, b_dir = root / "a", root / "b"
    a_dir.mkdir(), b_dir.mkdir()
    for f in files[:2]:
        shutil.copy(f, a_dir)
    for f in files[2:]:
        shutil.copy(f, b_dir)
    return str(all_dir), str(a_dir), str(b_dir)


def test_append_matches_full_build(split_corpora, tmp_path):
    all_dir, a_dir, b_dir = split_corpora
    cfg = BuildConfig(**TINY_CFG)
    import pyarrow.parquet as pq

    n_a = sum(pq.read_metadata(f).num_rows for f in glob.glob(a_dir + "/*.parquet"))
    full = build_index(all_dir, str(tmp_path / "idx_full"), cfg)
    base = build_index(a_dir, str(tmp_path / "idx_inc"), cfg)
    assert base.n_docs == n_a > 0
    res = append_index(b_dir, str(tmp_path / "idx_inc"), cfg)
    assert res.n_docs == full.n_docs == 200
    assert res.total_tokens == full.total_tokens
    assert res.n_chunks > base.n_chunks

    s_full = BM25Searcher(str(tmp_path / "idx_full"))
    s_inc = BM25Searcher(str(tmp_path / "idx_inc"))
    for q in QUERIES:
        e, f = s_inc.search(q, k=10), s_full.search(q, k=10)
        assert e["docID"].to_pylist() == f["docID"].to_pylist()
        assert e["score"].to_pylist() == f["score"].to_pylist()  # bitwise

    # idempotent: re-appending the same corpus skips all its chunks
    res2 = append_index(b_dir, str(tmp_path / "idx_inc"), cfg)
    assert res2.chunks_skipped >= 1
    assert res2.n_docs == 200
    assert res2.total_tokens == full.total_tokens


def test_append_rejects_config_mismatch(split_corpora, tmp_path):
    all_dir, a_dir, b_dir = split_corpora
    cfg = BuildConfig(**TINY_CFG)
    build_index(a_dir, str(tmp_path / "idx"), cfg)
    other = BuildConfig(**{**TINY_CFG, "num_parts": TINY_CFG["num_parts"] * 2})
    with pytest.raises(ValueError, match="fingerprint"):
        append_index(b_dir, str(tmp_path / "idx"), other)
