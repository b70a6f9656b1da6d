"""Per-posting style/weight bits (reference index.h:44-49): wire format
round-trip, rank-time weighting vs a brute-force oracle, prune soundness,
positions interplay, and compaction carry-through."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from index_ray.pipelines.build import BuildConfig, build_index
from index_ray.pipelines.query import BM25Searcher
from index_ray.stages.pack import pack_sorted, unpack_block

K1, B = 1.2, 0.75


# ---------------------------------------------------------------- wire ----


def test_pack_style_roundtrip():
    rng = np.random.default_rng(11)
    n = 2_000
    docs = np.sort(rng.choice(1_000_000, size=n, replace=False)).astype(np.int64)
    codes = np.zeros(n, np.int64)
    salts = np.zeros(n, np.int64)
    tfs = rng.integers(1, 9, n).astype(np.int64)
    style = rng.integers(0, 2, n).astype(np.int64)
    dictionary = pa.array(["t"])
    t = pack_sorted(codes, dictionary, salts, docs, tfs, 1 << 9, style=style)
    got_docs, got_tf, got_style, maxtf = [], [], [], []
    for r in t.to_pylist():
        d, w = unpack_block(r["postings"], r["df"])
        got_docs.append(d)
        got_tf.append(w >> 1)
        got_style.append(w & 1)
        # block stats stay REAL tf
        assert r["cf"] == int((w >> 1).sum())
        maxtf.append(max(s["max_tf"] for s in r["skips"]))
    assert np.concatenate(got_docs).tolist() == docs.tolist()
    assert np.concatenate(got_tf).tolist() == tfs.tolist()
    assert np.concatenate(got_style).tolist() == style.tolist()
    assert max(maxtf) == int(tfs.max())


# ------------------------------------------------------------- fixtures ----

N_DOCS = 60
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "needle"]


def _style_corpus(tmp_path, seed=5):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(N_DOCS):
        n_tok = int(rng.integers(6, 40))
        texts.append(" ".join(rng.choice(WORDS, size=n_tok).tolist()))
    src = tmp_path / "docs"
    src.mkdir(exist_ok=True)
    path = str(src / "documents.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
                "text": pa.array(texts),
            }
        ),
        path,
    )
    return path, texts


def _build(path, out, style_head=0, positions=False, chunk_docs=100):
    build_index(
        path,
        str(out),
        BuildConfig(
            tokenizer="simple", text_col="text", id_col="doc_id",
            chunk_docs=chunk_docs, num_parts=4, salt_docs=64, batch_size=16,
            style_head=style_head, positions=positions,
        ),
    )
    return str(out)


def _bm25_oracle(texts, terms, style_head=0, weight=1.0, k=10):
    """Brute-force BM25 with tf' = tf * weight on styled (doc, term) pairs
    (style = first occurrence ordinal < style_head)."""
    toks = [t.split() for t in texts]
    N = len(toks)
    dl = np.array([len(x) for x in toks], float)
    avgdl = dl.sum() / N
    scores = np.zeros(N)
    for term in terms:
        tf = np.array([x.count(term) for x in toks], float)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)
        if style_head:
            styled = np.array(
                [term in x[:style_head] for x in toks], bool
            )
            tfe = np.where(styled, tf * weight, tf)
        else:
            tfe = tf
        denom = tfe + K1 * (1 - B + B * dl / avgdl)
        with np.errstate(invalid="ignore"):
            contrib = np.where(tf > 0, idf * (tfe * (K1 + 1)) / denom, 0.0)
        scores += contrib
    nz = np.flatnonzero(scores)
    order = np.lexsort((nz, -scores[nz]))[:k]
    return nz[order].tolist(), scores[nz[order]]


# ------------------------------------------------------------- behavior ----


def test_style_weight_one_matches_plain_build(tmp_path):
    """style_head changes only the wire format: with style_weight=1 every
    query scores bitwise-identically to a no-style build, and the lexicon
    (df/cf) is unchanged."""
    path, _ = _style_corpus(tmp_path)
    plain = _build(path, tmp_path / "idx_plain")
    styled = _build(path, tmp_path / "idx_style", style_head=8)

    def lex(d):
        t = pa.concat_tables(
            pq.read_table(f)
            for f in sorted(glob.glob(os.path.join(d, "lexicon", "*.parquet")))
        )
        return t.sort_by("term").to_pylist()

    assert lex(plain) == lex(styled)
    s0 = BM25Searcher(plain, num_shards=1)
    s1 = BM25Searcher(styled, num_shards=1)
    for q in ["needle", "alpha beta", "gamma delta epsilon zeta"]:
        r0 = s0.search(q, k=20)
        r1 = s1.search(q, k=20)
        assert r0["docID"].to_pylist() == r1["docID"].to_pylist()
        assert r0["score"].to_pylist() == r1["score"].to_pylist()


@pytest.mark.parametrize("mode", ["or", "and"])
def test_style_weight_matches_bruteforce(tmp_path, mode):
    path, texts = _style_corpus(tmp_path)
    idx = _build(path, tmp_path / "idx", style_head=8)
    s = BM25Searcher(idx, num_shards=1)
    for q in ["needle", "alpha beta", "zeta epsilon"]:
        terms = q.split()
        r = s.search(q, k=10, mode=mode, style_weight=2.0)
        exp_docs, exp_scores = _bm25_oracle(texts, terms, style_head=8, weight=2.0)
        if mode == "and":
            keep = [
                (d, sc)
                for d, sc in zip(exp_docs, exp_scores)
                if all(t in texts[d].split() for t in terms)
            ]
            exp_docs = [d for d, _ in keep]
            exp_scores = [sc for _, sc in keep]
        assert r["docID"].to_pylist() == list(exp_docs)
        np.testing.assert_allclose(r["score"].to_numpy(), exp_scores, rtol=1e-12)


def test_style_prune_is_lossless(tmp_path):
    """Block-max pruning with a style weight must return exactly the
    no-prune results (bounds are multiplied by the weight)."""
    path, _ = _style_corpus(tmp_path, seed=9)
    idx = _build(path, tmp_path / "idx", style_head=8)
    s = BM25Searcher(idx, num_shards=1)
    for q in ["needle alpha", "beta gamma delta"]:
        a = s.search(q, k=5, prune=True, style_weight=3.0)
        b = s.search(q, k=5, prune=False, style_weight=3.0)
        assert a["docID"].to_pylist() == b["docID"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()


def test_style_reranks_head_doc(tmp_path):
    """The head_boost scenario via style bits: a doc whose needle sits in
    the head window outranks an otherwise-identical doc under weight > 1,
    ties (docID order) at weight 1."""
    filler = " ".join(f"pad{i}" for i in range(20))
    texts = [f"{filler} needle tail tail", f"needle {filler} tail tail"]
    src = tmp_path / "docs2"
    src.mkdir()
    path = str(src / "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(texts)}),
        path,
    )
    idx = _build(path, tmp_path / "idx2", style_head=8)
    s = BM25Searcher(idx, num_shards=1)
    plain = s.search("needle", k=2)
    assert plain["docID"].to_pylist() == [0, 1]
    assert plain["score"][0] == plain["score"][1]
    w = s.search("needle", k=2, style_weight=2.0)
    assert w["docID"].to_pylist() == [1, 0]


def test_style_with_positions(tmp_path):
    """Positions and style bits coexist: the positions stream is sized by
    REAL tf, so phrase queries stay exact on a style-built index."""
    filler = " ".join(f"pad{i}" for i in range(10))
    texts = [
        f"quick brown fox {filler}",
        f"{filler} quick brown cat",
        f"brown quick {filler}",
    ]
    src = tmp_path / "docs3"
    src.mkdir()
    path = str(src / "documents.parquet")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)}
        ),
        path,
    )
    idx = _build(path, tmp_path / "idx3", style_head=4, positions=True)
    s = BM25Searcher(idx, num_shards=1)
    r = s.phrase_many(["quick brown"])[0]
    assert r["docID"].to_pylist() == [0, 1]
    w = s.search("quick", k=3, style_weight=2.0)
    # doc 1 has quick OUTSIDE the head window -> lower effective tf
    assert w["docID"].to_pylist()[-1] == 1


def test_style_survives_compaction(tmp_path):
    from index_ray.pipelines.compact import compact_index

    path, texts = _style_corpus(tmp_path, seed=13)
    idx = _build(path, tmp_path / "idx4", style_head=8, chunk_docs=20)
    s = BM25Searcher(idx, num_shards=1)
    before = s.search("needle alpha", k=10, style_weight=2.0)
    compact_index(idx)
    assert len(glob.glob(os.path.join(idx, "chunks", "chunk-*"))) == 1
    s2 = BM25Searcher(idx, num_shards=1)
    after = s2.search("needle alpha", k=10, style_weight=2.0)
    assert before["docID"].to_pylist() == after["docID"].to_pylist()
    assert before["score"].to_pylist() == after["score"].to_pylist()


def test_style_weight_validation(tmp_path, tiny_index_dir):
    s = BM25Searcher(tiny_index_dir, num_shards=1)
    with pytest.raises(ValueError, match="style_head"):
        s.search("connection", style_weight=2.0)
    path, _ = _style_corpus(tmp_path)
    idx = _build(path, tmp_path / "idx5", style_head=8)
    s2 = BM25Searcher(idx, num_shards=1)
    with pytest.raises(ValueError, match=">= 1"):
        s2.search("needle", style_weight=0.5)


# ------------------------------------------------- 2-bit style enum ----

ENUM_LEVELS = (4, 16, 64)
ENUM_W = (1.0, 1.25, 1.5, 2.0)


def _build_enum(path, out, chunk_docs=100, positions=False):
    build_index(
        path,
        str(out),
        BuildConfig(
            tokenizer="simple", text_col="text", id_col="doc_id",
            chunk_docs=chunk_docs, num_parts=4, salt_docs=64, batch_size=16,
            style_levels=ENUM_LEVELS, positions=positions,
        ),
    )
    return str(out)


def _bm25_enum_oracle(texts, terms, weights=ENUM_W, k=10):
    """Brute-force BM25 with tf' = tf * w[class], class by the (doc, term)
    first-occurrence ordinal vs ENUM_LEVELS."""
    toks = [t.split() for t in texts]
    N = len(toks)
    dl = np.array([len(x) for x in toks], float)
    avgdl = dl.sum() / N
    scores = np.zeros(N)
    for term in terms:
        tf = np.array([x.count(term) for x in toks], float)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)
        w = np.ones(N)
        for i, x in enumerate(toks):
            if term in x:
                p = x.index(term)
                h1, h2, h3 = ENUM_LEVELS
                cls = 3 if p < h1 else (2 if p < h2 else (1 if p < h3 else 0))
                w[i] = weights[cls]
        tfe = tf * w
        denom = tfe + K1 * (1 - B + B * dl / avgdl)
        with np.errstate(invalid="ignore"):
            contrib = np.where(tf > 0, idf * (tfe * (K1 + 1)) / denom, 0.0)
        scores += contrib
    nz = np.flatnonzero(scores)
    order = np.lexsort((nz, -scores[nz]))[:k]
    return nz[order].tolist(), scores[nz[order]]


def test_pack_style2_roundtrip():
    rng = np.random.default_rng(17)
    n = 2_000
    docs = np.sort(rng.choice(1_000_000, size=n, replace=False)).astype(np.int64)
    codes = np.zeros(n, np.int64)
    salts = np.zeros(n, np.int64)
    tfs = rng.integers(1, 9, n).astype(np.int64)
    style = rng.integers(0, 4, n).astype(np.int64)
    dictionary = pa.array(["t"])
    t = pack_sorted(
        codes, dictionary, salts, docs, tfs, 1 << 9, style=style, style_bits=2
    )
    got_docs, got_tf, got_style = [], [], []
    for r in t.to_pylist():
        d, w = unpack_block(r["postings"], r["df"])
        got_docs.append(d)
        got_tf.append(w >> 2)
        got_style.append(w & 3)
        assert r["cf"] == int((w >> 2).sum())  # block stats stay REAL tf
    assert np.concatenate(got_docs).tolist() == docs.tolist()
    assert np.concatenate(got_tf).tolist() == tfs.tolist()
    assert np.concatenate(got_style).tolist() == style.tolist()


def test_style_enum_identity_weights_match_plain_build(tmp_path):
    path, _ = _style_corpus(tmp_path, seed=23)
    plain = _build(path, tmp_path / "e_plain")
    enum = _build_enum(path, tmp_path / "e_enum")
    sp = BM25Searcher(plain, num_shards=1)
    se = BM25Searcher(enum, num_shards=1)
    for q in ["needle alpha", "beta gamma delta", "zeta"]:
        a = sp.search(q, k=10)
        b = se.search(q, k=10, style_weight=(1.0, 1.0, 1.0, 1.0))
        assert a["docID"].to_pylist() == b["docID"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()  # bitwise


def test_style_enum_weights_match_bruteforce(tmp_path):
    path, texts = _style_corpus(tmp_path, seed=23)
    idx = _build_enum(path, tmp_path / "e_idx", chunk_docs=20)
    s = BM25Searcher(idx, num_shards=1)
    for q in ["needle alpha", "beta gamma", "epsilon zeta alpha"]:
        terms = sorted(set(q.split()))
        want_docs, want_scores = _bm25_enum_oracle(texts, terms)
        r = s.search(q, k=10, style_weight=ENUM_W)
        assert r["docID"].to_pylist() == want_docs
        np.testing.assert_allclose(
            r["score"].to_numpy(), want_scores, rtol=0, atol=1e-12
        )
        # prune soundness under per-class weights
        r2 = s.search(q, k=10, style_weight=ENUM_W, prune=False)
        assert r["docID"].to_pylist() == r2["docID"].to_pylist()
        assert r["score"].to_pylist() == r2["score"].to_pylist()


def test_style_enum_downweight_and_compaction(tmp_path):
    """Per-class weights below 1 are allowed (bounds stay sound), and the
    2-bit wire survives compaction bitwise."""
    from index_ray.pipelines.compact import compact_index

    path, texts = _style_corpus(tmp_path, seed=29)
    idx = _build_enum(path, tmp_path / "e_idx2", chunk_docs=20)
    s = BM25Searcher(idx, num_shards=1)
    down = (1.0, 1.0, 1.0, 0.25)  # demote very-early occurrences
    want_docs, want_scores = _bm25_enum_oracle(texts, ["needle", "alpha"], down)
    r = s.search("needle alpha", k=10, style_weight=down)
    assert r["docID"].to_pylist() == want_docs
    np.testing.assert_allclose(
        r["score"].to_numpy(), want_scores, rtol=0, atol=1e-12
    )
    before = s.search("needle alpha", k=10, style_weight=ENUM_W)
    compact_index(idx)
    s2 = BM25Searcher(idx, num_shards=1)
    after = s2.search("needle alpha", k=10, style_weight=ENUM_W)
    assert before["docID"].to_pylist() == after["docID"].to_pylist()
    assert before["score"].to_pylist() == after["score"].to_pylist()


def test_style_enum_validation(tmp_path):
    path, _ = _style_corpus(tmp_path)
    idx = _build_enum(path, tmp_path / "e_idx3")
    s = BM25Searcher(idx, num_shards=1)
    with pytest.raises(ValueError, match="entries"):
        s.search("needle", style_weight=(1.0, 2.0))  # wrong arity
    with pytest.raises(ValueError, match=">= 0"):
        s.search("needle", style_weight=(1.0, 1.0, 1.0, -1.0))
    with pytest.raises(ValueError, match="exclusive"):
        BuildConfig(style_head=8, style_levels=ENUM_LEVELS).style_bits
    with pytest.raises(ValueError, match="ascending"):
        build_index(
            path, str(tmp_path / "bad"),
            BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                        chunk_docs=100, num_parts=4, salt_docs=64,
                        style_levels=(16, 8, 4)),
        )


# ------------------------------------------------- federated x styles ----


def test_federated_respects_style_wire(ray_session, tmp_path):
    """FederatedBM25 over style-built partitions must decode the packed
    (tf << bits) | class wire slot, not score it as raw tf (which would
    inflate every tf 2-4x).  With the default weight 1.0 the styled
    scores equal the plain index's scores, so three views must agree
    bitwise: federated-styled == fused-styled == fused-plain."""
    from index_ray.pipelines.query import FederatedBM25

    path, texts = _style_corpus(tmp_path)
    t = pq.read_table(path)
    half = len(t) // 2
    lo, hi = str(tmp_path / "lo.parquet"), str(tmp_path / "hi.parquet")
    pq.write_table(t.slice(0, half), lo)
    pq.write_table(t.slice(half), hi)
    idx_lo = _build_enum(lo, tmp_path / "fed_lo")
    idx_hi = _build_enum(hi, tmp_path / "fed_hi")
    fused_styled = _build_enum(path, tmp_path / "fed_all")
    fused_plain = _build(path, tmp_path / "fed_plain")

    fed = FederatedBM25([idx_lo, idx_hi])
    assert fed.style_bits == 2
    qs = [("needle alpha", 10), ("beta gamma", 10)]
    got = fed.search_many(qs)
    want_styled = BM25Searcher(fused_styled).search_many(qs)
    want_plain = BM25Searcher(fused_plain).search_many(qs)
    for g, ws, wp in zip(got, want_styled, want_plain):
        assert g["docID"].to_pylist() == ws["docID"].to_pylist()
        assert g["score"].to_pylist() == ws["score"].to_pylist()  # bitwise
        assert g["docID"].to_pylist() == wp["docID"].to_pylist()
        assert g["score"].to_pylist() == wp["score"].to_pylist()

    # mixed wire formats must refuse, mirroring the tokenizer check
    with pytest.raises(ValueError, match="style wire"):
        FederatedBM25([idx_lo, fused_plain])
