"""BPE vocabulary training: exactness vs an independent pure-Python
reference, shard-count invariance, and early-stop behaviour."""

import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from index_ray.pipelines.bpe import bpe_train, word_frequencies
from index_ray.pipelines.textstats import BPE_PATTERN

SF = "/root/testdata/sf0.001"


def _ref_word_counts(texts):
    pat = re.compile(BPE_PATTERN)
    c = Counter()
    for t in texts:
        c.update(pat.findall(t))
    return c


def _ref_bpe(word_counts, n_merges, min_count=2):
    """Independent reference: plain full-rescan BPE over (word, count)."""
    syms = [(list(w), int(n)) for w, n in word_counts.items() if len(w) >= 2]
    merges = []
    for r in range(n_merges):
        counts = Counter()
        for sym, n in syms:
            for p in zip(sym, sym[1:]):
                counts[p] += n
        counts = +counts
        if not counts:
            break
        best = max(counts.values())
        if best < min_count:
            break
        left, right = min(p for p, n in counts.items() if n == best)
        merges.append((r, left, right, best))
        for i, (sym, n) in enumerate(syms):
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == left and sym[j + 1] == right:
                    out.append(left + right)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            syms[i] = (out, n)
    return merges


@pytest.fixture(scope="module")
def sf_texts():
    return pq.read_table(f"{SF}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()


def test_word_frequencies_match_reference(sf_texts):
    got = word_frequencies(SF).to_pandas()
    want = _ref_word_counts(sf_texts)
    assert dict(zip(got["word"], got["count"].astype(int))) == dict(want)


def test_bpe_train_matches_reference(sf_texts):
    n = 16
    got = bpe_train(SF, n_merges=n).to_pylist()
    want = _ref_bpe(_ref_word_counts(sf_texts), n)
    assert [(r["rank"], r["left"], r["right"], r["count"]) for r in got] == want
    assert len(got) == n  # sf0.001 has plenty of mass for 16 merges


def test_bpe_shard_invariance(sf_texts):
    a = bpe_train(SF, n_merges=8, num_shards=1).to_pylist()
    b = bpe_train(SF, n_merges=8, num_shards=3).to_pylist()
    assert a == b


def test_bpe_early_stop(tmp_path):
    # a corpus whose only repeated pair mass dries up: "ab" twice, then
    # every remaining pair is unique -> stops before n_merges
    d = tmp_path / "docs"
    d.mkdir()
    t = pa.table({"doc_id": [0, 1], "text": ["ab ab xy", "qr"]})
    pq.write_table(t, str(d / "documents.parquet"))
    got = bpe_train(str(d), n_merges=10, min_count=2).to_pylist()
    assert [(r["left"], r["right"], r["count"]) for r in got] == [("a", "b", 2)]


def test_bpe_consistency_zero_mismatches(ray_session):
    from index_ray.pipelines.bpe import bpe_consistency

    t = bpe_consistency(SF, n_merges=12).to_pydict()
    assert t["n_rank_mismatches"] == [0]
    assert t["n_count_mismatches"] == [0]


def test_bpe_encode_planted_merges(ray_session, tmp_path):
    """Merges on an engineered corpus are predictable; encoding must apply
    them lowest-rank-first across ALL occurrences."""
    from index_ray.pipelines.bpe import _merge_word, bpe_encode, bpe_train

    # 'abab' dominates: rank0 = (a,b); then (ab,ab)
    texts = ["abab " * 8, "abab abab ab", "xy " * 3]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    merges = bpe_train(str(d), n_merges=4)
    pairs = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))
    assert pairs[0] == ("a", "b")
    assert ("ab", "ab") in pairs
    rank_of = {p: i for i, p in enumerate(pairs)}
    pair_of = {i: p for p, i in rank_of.items()}
    # the planted word collapses fully: abab -> [abab]
    assert _merge_word("abab", rank_of, pair_of) == ["abab"]
    out = bpe_encode(str(d), n_merges=4).to_pandas().set_index("doc_id")
    # doc 0: 8 x "abab" -> 8 symbols
    assert out.loc[0, "n_ids"] == 8
    # doc 2: "xy" has no trained merges unless (x,y) was learned
    exp_xy = 1 if ("x", "y") in rank_of else 2
    assert out.loc[2, "n_ids"] == 3 * exp_xy


def test_bpe_encode_consistency_zero(ray_session):
    from index_ray.pipelines.bpe import bpe_encode_consistency

    t = bpe_encode_consistency(SF, n_merges=24)
    assert t["n_docs"][0].as_py() == 500
    assert t["n_mismatches"][0].as_py() == 0
