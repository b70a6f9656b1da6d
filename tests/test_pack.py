"""pack_runs round-trip: blocks, skips, block-max, salting, splitting."""

import numpy as np
import pyarrow as pa
import pytest

from index_ray.stages.pack import SKIP_INTERVAL, pack_runs, unpack_block


def _runs_table(rows):
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows]),
            "salt": pa.array([r[1] for r in rows], pa.int64()),
            "docID": pa.array([r[2] for r in rows], pa.int64()),
            "tf": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


@pytest.fixture()
def rows():
    rng = np.random.default_rng(0)
    rows = []
    for term, salt, docs in [
        ("alpha", 0, [1, 5, 9]),
        ("hot", 0, list(range(0, 300, 2))),
        ("hot", 1, list(range(300, 1000, 3))),
        ("zeta", 0, [7]),
    ]:
        for d in docs:
            rows.append((term, salt, d, int(rng.integers(1, 9))))
    rng.shuffle(rows)
    return rows


def test_pack_roundtrip(rows):
    out = pack_runs(_runs_table(rows), max_block_postings=100).to_pylist()
    exp = {}
    for term, _, d, f in rows:
        exp.setdefault(term, []).append((d, f))
    got = {}
    for r in out:
        docs, tfs = unpack_block(r["postings"], r["df"])
        assert list(docs) == sorted(docs.tolist())
        assert r["df"] == len(docs) and r["cf"] == int(tfs.sum())
        for i, s in enumerate(r["skips"]):
            lo, hi = i * SKIP_INTERVAL, min((i + 1) * SKIP_INTERVAL, r["df"])
            assert s["first_doc"] == docs[lo]
            assert s["max_tf"] == max(tfs[lo:hi])
            if i == 0:
                assert s["offset"] == 0
        got.setdefault(r["term"], []).append((r["block_seq"], docs, tfs))
    for term, blocks in got.items():
        blocks.sort(key=lambda b: b[0])
        assert [b[0] for b in blocks] == list(range(len(blocks)))  # dense seq
        docs = np.concatenate([b[1] for b in blocks])
        tfs = np.concatenate([b[2] for b in blocks])
        expected = sorted(exp[term])
        assert list(docs) == [d for d, _ in expected]
        assert list(tfs) == [f for _, f in expected]


def test_max_block_split(rows):
    out = pack_runs(_runs_table(rows), max_block_postings=100)
    assert max(out["df"].to_pylist()) <= 100


def test_duplicate_term_doc_rejected():
    rows = [("a", 0, 1, 1), ("a", 0, 1, 2)]
    with pytest.raises(ValueError):
        pack_runs(_runs_table(rows))


def test_empty_partition():
    out = pack_runs(_runs_table([]))
    assert len(out) == 0


def test_large_docids():
    # 10^12-scale docIDs survive the codec
    docs = [10**12 - 5, 10**12 - 1, 10**12 + 7]
    out = pack_runs(_runs_table([("t", 0, d, 3) for d in docs])).to_pylist()
    d2, t2 = unpack_block(out[0]["postings"], 3)
    assert list(d2) == docs and list(t2) == [3, 3, 3]


def test_unpack_subblocks_random_access():
    import pyarrow as pa

    from index_ray.stages.pack import unpack_subblocks

    rng = np.random.default_rng(3)
    docs = np.cumsum(rng.integers(1, 50, 1000)).astype(np.int64)
    tfs = rng.integers(1, 20, 1000).astype(np.int64)
    t = pa.table(
        {
            "term": pa.array(["t"] * 1000),
            "salt": pa.array([0] * 1000, pa.int64()),
            "docID": pa.array(docs),
            "tf": pa.array(tfs),
        }
    )
    out = pack_runs(t).to_pylist()
    assert len(out) == 1
    r = out[0]
    offs = np.array([s["offset"] for s in r["skips"]], dtype=np.int64)
    # decode only sub-blocks 2 and 5: must equal the slice of a full decode
    full_docs, full_tfs = unpack_block(r["postings"], r["df"])
    sel_docs, sel_tfs = unpack_subblocks(r["postings"], r["df"], offs, np.array([2, 5]))
    exp_docs = np.concatenate([full_docs[2 * 128:3 * 128], full_docs[5 * 128:6 * 128]])
    exp_tfs = np.concatenate([full_tfs[2 * 128:3 * 128], full_tfs[5 * 128:6 * 128]])
    np.testing.assert_array_equal(sel_docs, exp_docs)
    np.testing.assert_array_equal(sel_tfs, exp_tfs)
