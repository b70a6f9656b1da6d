"""Snapshot versioning / time travel: every commit publishes a readable
version; reads AS OF a version are bitwise-identical to the index as it
stood then; compaction retires versions whose chunks it rewrote."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import TINY_CFG, TINY_SEED
from index_ray.pipelines.build import BuildConfig, append_index, build_index
from index_ray.pipelines.compact import compact_index, delete_docs
from index_ray.pipelines.query import BM25Searcher
from index_ray.sources.corpus import generate_corpus
from index_ray.state.snapshots import (
    list_snapshots,
    load_snapshot,
    snapshot_index,
)

QUERIES = ["parse http request", "connection", "def return value"]


def _page(searcher, q):
    t = searcher.search(q, k=10)
    return list(zip(t["docID"].to_pylist(), t["score"].to_pylist()))


def _write_docs(path, ids, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "text": pa.array(list(texts), pa.string()),
            }
        ),
        str(path),
    )


@pytest.fixture(scope="module")
def tt_index(ray_session, tmp_path_factory):
    """even-half build (v1) -> odd append (v2) -> delete %7 (v3)."""
    root = tmp_path_factory.mktemp("snap")
    texts = generate_corpus(120, TINY_SEED)["content"].to_pylist()
    ids = np.arange(120, dtype=np.int64)
    even = ids % 2 == 0
    _write_docs(root / "even.parquet", ids[even], [texts[i] for i in ids[even]])
    _write_docs(root / "odd.parquet", ids[~even], [texts[i] for i in ids[~even]])
    cfg = BuildConfig(
        tokenizer="simple", text_col="text", id_col="doc_id", **TINY_CFG
    )
    idx = str(root / "idx")
    build_index(str(root / "even.parquet"), idx, cfg)
    append_index(str(root / "odd.parquet"), idx, cfg)
    deleted = ids[ids % 7 == 0]
    delete_docs(idx, deleted)
    # a from-scratch index over the even half: the v1 ground truth
    even_idx = str(root / "even_idx")
    build_index(str(root / "even.parquet"), even_idx, cfg)
    return {"idx": idx, "even_idx": even_idx, "deleted": set(map(int, deleted)),
            "root": root, "cfg": cfg}


def test_commits_published_in_order(tt_index):
    assert [s["version"] for s in list_snapshots(tt_index["idx"])] == [1, 2, 3]


def test_v1_bitwise_equals_fresh_even_build(tt_index):
    at_v1 = BM25Searcher(tt_index["idx"], snapshot=1)
    fresh = BM25Searcher(tt_index["even_idx"])
    for q in QUERIES:
        assert _page(at_v1, q) == _page(fresh, q)  # docIDs AND scores bitwise


def test_v2_ignores_later_tombstones_v3_equals_live(tt_index):
    at_v2 = BM25Searcher(tt_index["idx"], snapshot=2)
    at_v3 = BM25Searcher(tt_index["idx"], snapshot=3)
    live = BM25Searcher(tt_index["idx"])
    deleted = tt_index["deleted"]
    saw_deleted = False
    for q in QUERIES:
        v2 = _page(at_v2, q)
        saw_deleted |= any(d in deleted for d, _ in v2)
        assert all(d not in deleted for d, _ in _page(at_v3, q))
        assert _page(at_v3, q) == _page(live, q)
    assert saw_deleted  # time travel really resurrects pre-delete results


def test_snapshot_idempotent_no_version_churn(tt_index):
    before = [s["version"] for s in list_snapshots(tt_index["idx"])]
    assert snapshot_index(tt_index["idx"]) == before[-1]
    assert [s["version"] for s in list_snapshots(tt_index["idx"])] == before


def test_diff_snapshots_transitions(tt_index):
    """v1->v2 = exactly the appended odd half added; v2->v3 = exactly the
    %7 tombstones removed; v1->v3 nets both; v->v is empty."""
    from index_ray.pipelines.compact import diff_snapshots

    idx = tt_index["idx"]
    d12 = diff_snapshots(idx, 1, 2).to_pandas()
    assert set(d12["change"]) == {"added"}
    assert sorted(d12["doc_id"]) == [i for i in range(120) if i % 2 == 1]
    d23 = diff_snapshots(idx, 2, 3).to_pandas()
    assert set(d23["change"]) == {"removed"}
    assert sorted(d23["doc_id"]) == [i for i in range(120) if i % 7 == 0]
    d13 = diff_snapshots(idx, 1, 3).to_pandas()
    added = set(d13[d13["change"] == "added"]["doc_id"])
    removed = set(d13[d13["change"] == "removed"]["doc_id"])
    # odd docs added unless deleted again by v3 (net zero -> no row)
    assert added == {i for i in range(120) if i % 2 == 1 and i % 7 != 0}
    assert removed == {i for i in range(120) if i % 2 == 0 and i % 7 == 0}
    d22 = diff_snapshots(idx, 2, 2).to_pandas()
    assert len(d22) == 0


def test_compaction_retires_stale_snapshots(tt_index):
    idx = tt_index["idx"]
    compact_index(idx)
    versions = [s["version"] for s in list_snapshots(idx)]
    assert versions == [4]  # v1-v3 referenced rewritten chunks/tombstones
    with pytest.raises(FileNotFoundError, match="snapshot v1"):
        load_snapshot(idx, 1)
    # the post-compaction commit is itself a readable version == live
    at_v4 = BM25Searcher(idx, snapshot=4)
    live = BM25Searcher(idx)
    for q in QUERIES:
        assert _page(at_v4, q) == _page(live, q)


def test_rollback_and_expire(ray_session, tmp_path):
    """rollback_to_snapshot(v2) makes plain readers bitwise-equal to the
    AS-OF-v2 view (appends and deletes after v2 gone); a re-run after a
    simulated partial rollback completes it; expire_snapshots retains
    only the newest N."""
    import shutil as _sh

    from index_ray.state.snapshots import (
        expire_snapshots,
        list_snapshots,
        rollback_to_snapshot,
    )

    root = tmp_path / "rb"
    root.mkdir()
    texts = generate_corpus(100, TINY_SEED)["content"].to_pylist()
    ids = np.arange(100, dtype=np.int64)
    even = ids % 2 == 0
    _write_docs(root / "even.parquet", ids[even], [texts[i] for i in ids[even]])
    _write_docs(root / "odd.parquet", ids[~even], [texts[i] for i in ids[~even]])
    cfg = BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                      **TINY_CFG)
    idx = str(root / "idx")
    build_index(str(root / "even.parquet"), idx, cfg)     # v1
    append_index(str(root / "odd.parquet"), idx, cfg)     # v2
    delete_docs(idx, ids[ids % 7 == 0])                   # v3
    want = [_page(BM25Searcher(idx, snapshot=2), q) for q in QUERIES]

    rollback_to_snapshot(idx, 2)
    got = [_page(BM25Searcher(idx), q) for q in QUERIES]
    assert got == want  # bitwise: docIDs and scores
    # v3 must be retired (its tombstone file is gone)
    vs = [s["version"] for s in list_snapshots(idx)]
    assert 3 not in vs and 2 in vs

    # partial-rollback re-run: simulate a crash that removed a chunk but
    # never committed stats.json — re-running completes the rollback
    delete_docs(idx, ids[ids % 11 == 0])                  # new version
    chunks = sorted(
        p for p in (root / "idx" / "chunks").iterdir() if p.name.startswith("chunk-")
    )
    # tombstones exist again; wipe them like a half-finished rollback
    for p in (root / "idx" / "tombstones").iterdir():
        p.unlink()
    rollback_to_snapshot(idx, 2)
    got2 = [_page(BM25Searcher(idx), q) for q in QUERIES]
    assert got2 == want

    # retention: mint a few more versions, then keep only 2
    delete_docs(idx, ids[ids % 13 == 0])
    rollback_to_snapshot(idx, 2)
    n_before = len(list_snapshots(idx))
    retired = expire_snapshots(idx, keep_last=2)
    snaps = list_snapshots(idx)
    assert len(snaps) == min(2, n_before)
    assert all(r < snaps[0]["version"] for r in retired)


def test_rollback_drops_reverse_lexicon(ray_session, tmp_path):
    """rollback_to_snapshot swaps the live lexicon; a reverse-lexicon
    sidecar built for the PRE-rollback vocabulary must go with it —
    otherwise suffix wildcards probe phantom terms (or silently miss
    ones the restored lexicon has).  After the rollback the sweep
    fallback serves correct results; rebuilding the sidecar restores
    the probe path over the restored vocabulary."""
    from index_ray.pipelines.query import build_reverse_lexicon
    from index_ray.state.snapshots import rollback_to_snapshot, snapshot_index

    d = tmp_path / "rrl"
    d.mkdir()
    cfg = BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                      **TINY_CFG)
    _write_docs(d / "base.parquet", [0, 1], ["window row", "plain filler"])
    _write_docs(d / "more.parquet", [2], ["shadow crow gown"])
    idx = str(tmp_path / "rrl_idx")
    build_index(str(d / "base.parquet"), idx, cfg)
    v = snapshot_index(idx)
    append_index(str(d / "more.parquet"), idx, cfg)
    build_reverse_lexicon(idx)  # sidecar indexes the POST-append vocab
    assert BM25Searcher(idx, num_shards=1).lexicon.wildcard_terms("*ow") == [
        "crow", "row", "shadow", "window",
    ]

    rollback_to_snapshot(idx, v)
    assert not os.path.isdir(os.path.join(idx, "lexicon_rev"))  # dropped
    s = BM25Searcher(idx, num_shards=1)
    assert s.lexicon.wildcard_terms("*ow") == ["row", "window"]  # sweep
    n = build_reverse_lexicon(idx)
    assert n == len(s.lexicon._map)
    s2 = BM25Searcher(idx, num_shards=1)
    assert s2.lexicon.wildcard_terms("*ow") == ["row", "window"]  # probe
