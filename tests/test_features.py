"""Round-2 feature tests: positional postings + phrase, boolean AND,
docmap meta join, oversized-partition split, oversized-bucket dedup,
vectorized simhash, min-label propagation."""

import numpy as np
import pyarrow as pa
import pytest

from index_ray.functions import minhash as mh
from index_ray.functions.tokenize import TokenNormalizer, tokenize_batch
from index_ray.pipelines.build import BuildConfig, build_index
from index_ray.pipelines.dedup import _pairs_from_bucket, min_label_propagation
from index_ray.pipelines.query import BM25Searcher
from index_ray.stages.pack import (
    pack_sorted,
    unpack_block,
    unpack_positions,
)

from conftest import TINY_CFG


# ---------------------------------------------------------------- pack ----


def _sorted_postings(rng, n_terms=5, docs_per_term=300):
    codes, salts, docs, tfs, pos = [], [], [], [], []
    for c in range(n_terms):
        ds = np.sort(rng.choice(100_000, size=docs_per_term, replace=False))
        for d in ds:
            tf = int(rng.integers(1, 5))
            p = np.sort(rng.choice(1000, size=tf, replace=False))
            codes.append(c)
            salts.append(0)
            docs.append(int(d))
            tfs.append(tf)
            pos.append(p)
    return (
        np.array(codes, np.int64),
        np.array(salts, np.int64),
        np.array(docs, np.int64),
        np.array(tfs, np.int64),
        np.concatenate(pos).astype(np.int64),
    )


def test_pack_positions_roundtrip():
    rng = np.random.default_rng(7)
    codes, salts, docs, tfs, pos = _sorted_postings(rng)
    dictionary = pa.array([f"t{i}" for i in range(5)])
    t = pack_sorted(codes, dictionary, salts, docs, tfs, 128, pos=pos)
    assert "positions" in t.schema.names
    # reassemble occurrence stream and compare with the input
    got_pos, got_docs = [], []
    occ = 0
    for r in t.to_pylist():
        d, f = unpack_block(r["postings"], r["df"])
        p = unpack_positions(r["positions"], f)
        assert len(p) == r["cf"]
        got_docs.append(np.repeat(d, f))
        got_pos.append(p)
    got_pos = np.concatenate(got_pos)
    assert got_pos.tolist() == pos.tolist()


def test_pack_oversized_partition_splits():
    """A partition whose encoded bytes exceed max_bytes packs into multiple
    self-contained tables instead of raising (old 2GB guard)."""
    rng = np.random.default_rng(3)
    n = 50_000
    docs = np.sort(rng.choice(10_000_000, size=n, replace=False)).astype(np.int64)
    codes = np.zeros(n, np.int64)
    salts = np.zeros(n, np.int64)
    tfs = rng.integers(1, 100, n).astype(np.int64)
    dictionary = pa.array(["stopword"])
    full = pack_sorted(codes, dictionary, salts, docs, tfs, 1 << 10)
    tiny = pack_sorted(codes, dictionary, salts, docs, tfs, 1 << 10, max_bytes=8_192)
    assert len(tiny) >= len(full)
    # identical decoded stream + dense block_seq
    def stream(t):
        ds, fs = [], []
        for r in t.to_pylist():
            d, f = unpack_block(r["postings"], r["df"])
            ds.append(d)
            fs.append(f)
        return np.concatenate(ds), np.concatenate(fs)

    d1, f1 = stream(full)
    d2, f2 = stream(tiny)
    assert d1.tolist() == d2.tolist() and f1.tolist() == f2.tolist()
    seqs = tiny["block_seq"].to_pylist()
    assert seqs == list(range(len(seqs)))


# ------------------------------------------------------ phrase / AND ------


@pytest.fixture(scope="module")
def pos_index_dir(tiny_corpus_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("index_pos")
    build_index(tiny_corpus_dir, str(d), BuildConfig(positions=True, **TINY_CFG))
    return str(d)


def _doc_tokens(table, mode="code"):
    norm = TokenNormalizer(mode)
    d, tid, vocab = tokenize_batch(table["content"].combine_chunks(), norm)
    out = [[] for _ in range(len(table))]
    for di, ti in zip(d, tid):
        out[di].append(vocab[ti])
    return out


def test_phrase_matches_bruteforce(pos_index_dir, tiny_corpus_table):
    toks = _doc_tokens(tiny_corpus_table)
    searcher = BM25Searcher(pos_index_dir, num_shards=2)
    # phrases sampled from real documents + one absent phrase
    phrases = [
        " ".join(toks[0][3:5]),
        " ".join(toks[7][0:3]),
        " ".join(toks[11][2:4]),
        "zzz absent phrase",
    ]
    results = searcher.phrase_many(phrases)
    for q, r in zip(phrases, results):
        terms = q.split()
        expect = {}
        for docid, tk in enumerate(toks):
            n = sum(
                1
                for s in range(len(tk) - len(terms) + 1)
                if tk[s : s + len(terms)] == terms
            )
            if n:
                expect[docid] = n
        got = dict(zip(r["docID"].to_pylist(), r["n_matches"].to_pylist()))
        assert got == expect, q


def test_phrase_requires_positions(tiny_index_dir):
    searcher = BM25Searcher(tiny_index_dir, num_shards=1)
    with pytest.raises(ValueError, match="positions"):
        searcher.phrase_many(["any phrase"])


def test_and_mode_is_exact_intersection(tiny_index_dir, tiny_corpus_table):
    toks = _doc_tokens(tiny_corpus_table)
    searcher = BM25Searcher(tiny_index_dir, num_shards=2)
    for q in ["parse http request", "def return value", "connection"]:
        from index_ray.pipelines.query import query_terms

        terms = query_terms(q, "code")
        expect = {d for d, tk in enumerate(toks) if all(t in tk for t in terms)}
        big = 10_000
        r_and = searcher.search(q, k=big, mode="and")
        assert set(r_and["docID"].to_pylist()) == expect, q
        # AND scores == OR scores restricted to the intersection set
        r_or = searcher.search(q, k=big, mode="or")
        or_scores = dict(zip(r_or["docID"].to_pylist(), r_or["score"].to_pylist()))
        for d, s in zip(r_and["docID"].to_pylist(), r_and["score"].to_pylist()):
            assert s == or_scores[d]
    # a term absent from the lexicon empties the conjunction
    r = searcher.search("connection qqqabsentterm", k=10, mode="and")
    assert len(r) == 0


def test_meta_join(tiny_index_dir, tiny_corpus_table):
    searcher = BM25Searcher(tiny_index_dir, num_shards=2)
    r = searcher.search("connection", k=10, meta_cols=["path", "repo"])
    assert r.num_rows > 0
    paths = tiny_corpus_table["path"].to_pylist()
    repos = tiny_corpus_table["repo"].to_pylist()
    for row in r.to_pylist():
        assert row["path"] == paths[row["docID"]]
        assert row["repo"] == repos[row["docID"]]


@pytest.fixture(scope="module")
def field_index_dir(tiny_corpus_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("index_field")
    build_index(
        tiny_corpus_dir, str(d), BuildConfig(field_col="lang", **TINY_CFG)
    )
    return str(d)


def test_field_scoped_search(field_index_dir, tiny_corpus_table):
    from index_ray.pipelines.query import query_terms

    toks = _doc_tokens(tiny_corpus_table)
    langs = tiny_corpus_table["lang"].to_pylist()
    searcher = BM25Searcher(field_index_dir, num_shards=2)
    field = langs[0]
    q = "connection"
    terms = query_terms(q, "code")
    expect = {
        d
        for d, tk in enumerate(toks)
        if langs[d] == field and any(t in tk for t in terms)
    }
    r = searcher.search(q, k=10_000, field=field)
    assert set(r["docID"].to_pylist()) == expect
    # unscoped search on the same index still sees every doc
    r_all = searcher.search(q, k=10_000)
    expect_all = {d for d, tk in enumerate(toks) if any(t in tk for t in terms)}
    assert set(r_all["docID"].to_pylist()) == expect_all
    # unknown field namespace: empty, not an error
    assert len(searcher.search(q, k=10, field="nosuchlang")) == 0


def test_field_requires_field_col(tiny_index_dir):
    searcher = BM25Searcher(tiny_index_dir, num_shards=1)
    with pytest.raises(ValueError, match="field_col"):
        searcher.search("connection", field="en")


def test_head_boost_reranks(tmp_path):
    """A doc with the query term inside the first H tokens must outrank an
    otherwise-identical doc with the term only later, under boost — and the
    two must tie (docID order) without boost."""
    import pyarrow.parquet as pq

    filler = " ".join(f"pad{i}" for i in range(20))
    texts = [
        f"{filler} needle tail tail",  # term outside the head window
        f"needle {filler} tail tail",  # term inside the head window
    ]
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(texts)}
        ),
        str(src / "documents.parquet"),
    )
    out = tmp_path / "idx"
    build_index(
        str(src / "documents.parquet"),
        str(out),
        BuildConfig(
            tokenizer="simple", text_col="text", id_col="doc_id",
            chunk_docs=100, num_parts=4, salt_docs=64, head_tokens=8,
        ),
    )
    s = BM25Searcher(str(out), num_shards=1)
    plain = s.search("needle", k=2)
    assert plain["docID"].to_pylist() == [0, 1]  # equal scores, docID tiebreak
    assert plain["score"][0] == plain["score"][1]
    boosted = s.search("needle", k=2, boost={"head": 2.0})
    assert boosted["docID"].to_pylist() == [1, 0]
    with pytest.raises(ValueError, match="boost"):
        s.search("needle", mode="and", boost={"head": 2.0})


def test_boost_requires_markers(tiny_index_dir):
    searcher = BM25Searcher(tiny_index_dir, num_shards=1)
    with pytest.raises(ValueError, match="marker"):
        searcher.search("connection", boost={"head": 2.0})


def test_find_docs_lookup(tiny_index_dir, tiny_corpus_table):
    """find_docs must return exactly the docmap rows whose key column
    matches — the FindUrl analog (every doc sharing the key comes back)."""
    from index_ray.pipelines.query import find_docs

    paths = tiny_corpus_table["path"].to_pylist()
    want_path = paths[7]
    expect = {i for i, p in enumerate(paths) if p == want_path}
    t = find_docs(tiny_index_dir, "path", [want_path])
    assert set(t["docID"].to_pylist()) == expect
    assert set(t["path"].to_pylist()) == {want_path}
    assert len(find_docs(tiny_index_dir, "path", ["no/such/file.py"])) == 0


# ------------------------------------------------------ dedup helpers -----


def test_oversized_bucket_pairs_not_dropped():
    """>512 distinct near-identical signatures in one bucket: round 1
    silently dropped the pairwise verify; now every pair is found."""
    n = 600
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, 64).astype(np.uint8)
    sigs = np.tile(base, (n, 1))
    for i in range(n):  # vary one byte -> 63/64 similarity, all distinct
        sigs[i, i % 32] = (sigs[i, i % 32] + 1 + i // 32) % 256
    group = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
        }
    )
    pairs = _pairs_from_bucket(group)
    sim = (sigs[:, None, :] == sigs[None, :, :]).sum(axis=2)
    expect = int((np.triu(sim >= mh.SIM_THRESHOLD_BYTES, k=1)).sum())
    assert expect > 0
    assert pairs.num_rows == expect


def test_simhash_segments_matches_scalar():
    rng = np.random.default_rng(11)
    d = np.repeat(np.arange(5), [3, 0, 7, 1, 4][:5])
    d = np.sort(d)
    th = rng.integers(0, 1 << 63, len(d)).astype(np.uint64)
    tf = rng.integers(1, 6, len(d)).astype(np.int64)
    out = mh.simhash_segments(d, th, tf, 5)
    for i in range(5):
        sel = d == i
        assert out[i] == mh.simhash64(th[sel], tf[sel])


def test_min_label_propagation():
    a = np.array([1, 2, 10, 11, 20], np.int64)
    b = np.array([2, 3, 11, 12, 21], np.int64)
    members, rep = min_label_propagation(a, b)
    got = dict(zip(members.tolist(), rep.tolist()))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # long chain: propagation must fully converge, not stop after one round
    chain_a = np.arange(100, 200, dtype=np.int64)
    chain_b = chain_a + 1
    m2, r2 = min_label_propagation(chain_a, chain_b)
    assert set(r2.tolist()) == {100}


def test_near_matches_bruteforce(pos_index_dir, tiny_corpus_table):
    toks = _doc_tokens(tiny_corpus_table)
    searcher = BM25Searcher(pos_index_dir, num_shards=2)
    # pairs sampled from real documents (+ one absent term), varied windows
    pairs = [
        (toks[0][3], toks[0][4], 1),
        (toks[7][0], toks[7][5], 3),
        (toks[11][2], toks[11][2], 0),   # same term: trivially near itself
        ("zzzabsent", toks[0][0], 5),
    ]
    results = searcher.near_many(pairs)
    for (a, b, w), r in zip(pairs, results):
        expect = {}
        for docid, tk in enumerate(toks):
            pa_pos = [i for i, t in enumerate(tk) if t == a]
            pb_pos = [i for i, t in enumerate(tk) if t == b]
            n = sum(1 for p in pa_pos if any(abs(p - q) <= w for q in pb_pos))
            if n:
                expect[docid] = n
        got = dict(zip(r["docID"].to_pylist(), r["n_matches"].to_pylist()))
        assert got == expect, (a, b, w)


def test_near_requires_positions(tiny_index_dir):
    searcher = BM25Searcher(tiny_index_dir, num_shards=1)
    with pytest.raises(ValueError, match="positions"):
        searcher.near_many([("a", "b", 2)])


def test_media_consistency_goldens(ray_session):
    from index_ray.pipelines.multimodal import media_consistency

    t = media_consistency("ignored").to_pandas().iloc[0]
    assert int(t["n_images"]) == 200
    assert int(t["hist_hash_sum"]) == 943404
    assert int(t["n_sampled_frames"]) == 171
    assert int(t["frame_bytes_sum"]) == 857982


def test_msm_mode_counts_distinct_matches(tiny_index_dir, tiny_corpus_table):
    """msm=m returns exactly the docs matching >= m distinct query terms,
    with OR-identical scores; msm=1 == OR set, msm=n_terms == AND set."""
    from index_ray.pipelines.query import query_terms

    toks = _doc_tokens(tiny_corpus_table)
    searcher = BM25Searcher(tiny_index_dir, num_shards=2)
    big = 10_000
    for q in ["parse http request", "def return value", "connection socket"]:
        terms = query_terms(q, "code")
        r_or = searcher.search(q, k=big, mode="or")
        or_scores = dict(zip(r_or["docID"].to_pylist(), r_or["score"].to_pylist()))
        for m in range(1, len(terms) + 1):
            expect = {
                d
                for d, tk in enumerate(toks)
                if sum(t in tk for t in set(terms)) >= m
            }
            r = searcher.search(q, k=big, mode="msm", msm=m)
            assert set(r["docID"].to_pylist()) == expect, (q, m)
            for d, s in zip(r["docID"].to_pylist(), r["score"].to_pylist()):
                assert s == or_scores[d], (q, m)  # scores are plain OR sums
    # duplicate query terms are deduped before counting
    a = searcher.search("connection connection socket", k=big, mode="msm", msm=2)
    b = searcher.search("connection socket", k=big, mode="msm", msm=2)
    assert a["docID"].to_pylist() == b["docID"].to_pylist()
    # absent terms can never satisfy msm
    r = searcher.search("qqqabsentterm zzzmissing", k=10, mode="msm", msm=2)
    assert len(r) == 0
    with pytest.raises(ValueError, match="msm"):
        searcher.search("connection", k=10, mode="msm", msm=0)


def test_within_lev1_matches_duckdb():
    import duckdb

    from index_ray.pipelines.query import _within_lev1

    words = [
        "", "a", "ab", "abc", "abcd", "acb", "bac", "cab", "abx", "xbc",
        "abcx", "xabc", "abxc", "bc", "ac", "abcde", "hello", "hallo",
        "hell", "shell", "olleh",
    ]
    con = duckdb.connect()
    for a in words:
        for b in words:
            want = con.sql(f"SELECT levenshtein('{a}','{b}') <= 1").fetchone()[0]
            assert _within_lev1(a, b) == want, (a, b)


def test_fuzzy_terms_is_exact_neighborhood(tiny_index_dir):
    import duckdb

    searcher = BM25Searcher(tiny_index_dir, num_shards=1)
    lex = searcher.lexicon
    vocab = sorted(lex._map)
    con = duckdb.connect()
    for probe in ["connection", "conection", "connectionn", "pars", "zzzz", "def"]:
        got = lex.fuzzy_terms(probe)
        want = sorted(
            v
            for v in vocab
            if con.sql(f"SELECT levenshtein('{probe}','{v}') <= 1").fetchone()[0]
        )
        assert got == want, probe


def test_search_fuzzy_equals_expanded_or(tiny_index_dir):
    """Fuzzy search == plain OR search over the manually expanded term set."""
    searcher = BM25Searcher(tiny_index_dir, num_shards=2)
    lex = searcher.lexicon
    q = "conection socket"
    from index_ray.pipelines.query import query_terms

    expanded = sorted(
        set().union(*[set(lex.fuzzy_terms(t)) for t in query_terms(q, "code")])
    )
    assert expanded  # the typo does recover neighbors in the tiny corpus
    big = 10_000
    r_fuzzy = searcher.search_fuzzy_many([(q, big)])[0]
    r_or = searcher.search(" ".join(expanded), k=big, mode="or")
    assert r_fuzzy["docID"].to_pylist() == r_or["docID"].to_pylist()
    assert r_fuzzy["score"].to_pylist() == r_or["score"].to_pylist()


def test_fuzzy_rejects_marker_indexes(tiny_corpus_dir, tmp_path):
    """Marker-namespace lexicons would leak '{ns}:{t}' terms into the
    fuzzy neighborhood ('en:a' is within distance 1 of 'ena'), so fuzzy
    search refuses them loudly."""
    from index_ray.pipelines.build import BuildConfig, build_index

    out = str(tmp_path / "idx_markers")
    build_index(
        tiny_corpus_dir, out,
        BuildConfig(chunk_docs=100, num_parts=4, salt_docs=64, batch_size=64,
                    head_tokens=4),
    )
    s = BM25Searcher(out, num_shards=1)
    with pytest.raises(ValueError, match="marker-namespace"):
        s.search_fuzzy_many([("connection", 10)])


# ------------------------------------------------------------- query DSL --


def test_parse_dsl_clauses():
    from index_ray.pipelines.query import parse_dsl

    s = parse_dsl('+req -exc opt pre* fuz~ ns:val "a phrase" +')
    assert s["req"] == ["req"] and s["exc"] == ["exc"] and s["opt"] == ["opt"]
    assert s["prefix"] == ["pre"] and s["fuzzy"] == ["fuz"]
    assert s["fields"] == [("ns", "val")] and s["phrases"] == ["a phrase"]


def test_dsl_composes_primitives(pos_index_dir, tiny_corpus_table):
    searcher = BM25Searcher(pos_index_dir, num_shards=2)
    # bare terms == plain OR search (bitwise)
    a = searcher.search_dsl("parse connection", k=10)
    b = searcher.search("parse connection", k=10)
    assert a["docID"].to_pylist() == b["docID"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()
    # exclusion == the NOT channel (bitwise)
    e = searcher.search_dsl("parse connection -socket", k=10)
    f = searcher.search_many([("parse connection", 10)], exclude=["socket"])[0]
    assert e["docID"].to_pylist() == f["docID"].to_pylist()
    assert e["score"].to_pylist() == f["score"].to_pylist()
    # all-required == conjunctive match set, scores = OR scores on it
    c = searcher.search_dsl("+parse +connection", k=10)
    d = searcher.search("parse connection", k=10, mode="and")
    assert c["docID"].to_pylist() == d["docID"].to_pylist()
    # phrase clause filters; scored by the bare term
    toks = _doc_tokens(tiny_corpus_table)
    ph = " ".join(toks[7][0:3])
    g = searcher.search_dsl(f'"{ph}" parse', k=10)
    ph_docs = set(searcher.phrase_many([ph])[0]["docID"].to_pylist())
    full = searcher.search("parse", k=10**6, prune=False)
    want = [
        (doc, s)
        for doc, s in zip(full["docID"].to_pylist(), full["score"].to_pylist())
        if doc in ph_docs
    ][:10]
    assert g["docID"].to_pylist() == [doc for doc, _ in want]
    assert g["score"].to_pylist() == [s for _, s in want]
    assert len(g) > 0  # the planted phrase matches something


def test_dsl_requires_capabilities(tiny_index_dir):
    s = BM25Searcher(tiny_index_dir, num_shards=1)
    import pytest as _pt

    with _pt.raises(ValueError, match="positions"):
        s.search_dsl('"merge sort" key')
    with _pt.raises(ValueError, match="field_col"):
        s.search_dsl("lang:python parse")


def test_wildcard_terms_and_search(ray_session, tmp_path):
    """Single-star wildcard semantics: suffix and infix expansion match
    LIKE with the overlap length guard; bare '*' and multi-star raise;
    the search surface scores the expansion as a plain disjunction
    (bitwise equal to typing the expanded terms)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq
    import pytest as _pytest

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher

    texts = [
        "window widow shadow row",
        "fast fit foot fat feet",
        "aba ab aab abab",
        "plain filler text",
    ]
    d = tmp_path / "wc"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "wc_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    s = BM25Searcher(idx, num_shards=1)
    lx = s.lexicon
    assert lx.wildcard_terms("*ow") == ["row", "shadow", "widow", "window"]
    assert lx.wildcard_terms("f*t") == ["fast", "fat", "feet", "fit", "foot"]
    # overlap guard: 'ab*b' must NOT match 'ab' (LIKE 'ab%b' semantics)
    assert lx.wildcard_terms("ab*b") == ["abab"]
    assert lx.wildcard_terms("a*b") == ["aab", "ab", "abab"]
    with _pytest.raises(ValueError, match="one '\\*'"):
        lx.wildcard_terms("a*b*c")
    with _pytest.raises(ValueError, match="whole lexicon"):
        lx.wildcard_terms("*")
    with _pytest.raises(ValueError, match="limit"):
        lx.wildcard_terms("*ow", limit=2)
    # the search == the expanded disjunction, bitwise
    r = s.search_wildcard_many([("*ow", 10)])[0]
    expanded = s.search("row shadow widow window", k=10)
    assert r["docID"].to_pylist() == expanded["docID"].to_pylist()
    assert r["score"].to_pylist() == expanded["score"].to_pylist()


def test_reverse_lexicon_probe_matches_sweep(ray_session, tmp_path):
    """The reversed-term sidecar turns '*s' into a range probe whose
    expansion is identical to the vocabulary sweep, and the search built
    on it stays bitwise-identical."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher, build_reverse_lexicon

    texts = [
        "window widow shadow row",
        "fast fit foot fat feet",
        "crow grow own town gown",
        "plain filler text",
    ]
    d = tmp_path / "rl"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "rl_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    s = BM25Searcher(idx, num_shards=1)
    sweep = s.lexicon.wildcard_terms("*ow")
    assert sweep == ["crow", "grow", "row", "shadow", "widow", "window"]
    sweep_search = s.search_wildcard_many([("*ow", 10)])[0]

    n = build_reverse_lexicon(idx)
    assert n == len(s.lexicon._map)
    s2 = BM25Searcher(idx, num_shards=1)
    import os as _os

    assert _os.path.isdir(_os.path.join(idx, "lexicon_rev"))
    probe = s2.lexicon.wildcard_terms("*ow")
    assert probe == sweep
    assert s2.lexicon.wildcard_terms("*own") == ["gown", "own", "town"]
    probe_search = s2.search_wildcard_many([("*ow", 10)])[0]
    assert probe_search["docID"].to_pylist() == sweep_search["docID"].to_pylist()
    assert probe_search["score"].to_pylist() == sweep_search["score"].to_pylist()
    # limit budget still enforced on the probe path
    import pytest as _pytest

    with _pytest.raises(ValueError, match="limit"):
        s2.lexicon.wildcard_terms("*ow", limit=3)


def test_reverse_lexicon_lifecycle_across_append(ray_session, tmp_path):
    """The sidecar is written by the standard build finalize
    (``BuildConfig.reverse_lexicon`` default) and REFRESHED against the
    new vocabulary on every lexicon rewrite — after an append a suffix
    wildcard probes the NEW terms, never a stale rev table.  With the
    flag off, no sidecar is written and the sweep fallback serves the
    same answers; fsck validates a present sidecar mirrors the lexicon."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, append_index, build_index
    from index_ray.pipelines.query import BM25Searcher
    from index_ray.state.fsck import fsck_index

    d = tmp_path / "ri"
    d.mkdir()
    cfg = BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                      chunk_docs=100, num_parts=4, salt_docs=64)
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["window row", "plain filler"], pa.string()),
            }
        ),
        str(d / "base.parquet"),
    )
    idx = str(tmp_path / "ri_idx")
    build_index(str(d / "base.parquet"), idx, cfg)
    # day one: the finalize wrote the sidecar — no maintenance pass needed
    assert _os.path.isdir(_os.path.join(idx, "lexicon_rev"))
    s = BM25Searcher(idx, num_shards=1)
    assert s.lexicon.wildcard_terms("*ow") == ["row", "window"]

    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([2], pa.int64()),
                "text": pa.array(["shadow crow"], pa.string()),
            }
        ),
        str(d / "more.parquet"),
    )
    append_index(str(d / "more.parquet"), idx, cfg)
    # refreshed, not stale: the probe path answers over the NEW vocabulary
    assert _os.path.isdir(_os.path.join(idx, "lexicon_rev"))
    s2 = BM25Searcher(idx, num_shards=1)
    assert s2.lexicon.wildcard_terms("*ow") == ["crow", "row", "shadow", "window"]
    # fsck agrees the sidecar mirrors the merged lexicon
    fs = fsck_index(idx).to_pandas().set_index("scope")
    assert fs.loc["__global__", "n_issues"] == 0, fs.loc["__global__", "issues"]

    # flag off: no sidecar, sweep fallback, same answers
    cfg_off = BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                          chunk_docs=100, num_parts=4, salt_docs=64,
                          reverse_lexicon=False)
    idx2 = str(tmp_path / "ri_idx2")
    build_index(str(d / "base.parquet"), idx2, cfg_off)
    assert not _os.path.isdir(_os.path.join(idx2, "lexicon_rev"))
    s3 = BM25Searcher(idx2, num_shards=1)
    assert s3.lexicon.wildcard_terms("*ow") == ["row", "window"]


def test_fsck_flags_corrupt_reverse_lexicon(ray_session, tmp_path):
    """A sidecar that drifted from the lexicon (wrong terms) is a global
    fsck issue, not a silent wrong-wildcard hazard."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.state.fsck import fsck_index

    d = tmp_path / "fc"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["window row"], pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "fc_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    fs = fsck_index(idx).to_pandas().set_index("scope")
    assert fs.loc["__global__", "n_issues"] == 0
    # corrupt the sidecar: swap in a wrong term
    rev = _os.path.join(idx, "lexicon_rev")
    f = sorted(_os.listdir(rev))[0]
    _pq.write_table(
        pa.table(
            {
                "rev_term": pa.array(["gnorw"], pa.string()),
                "term": pa.array(["wrong"], pa.string()),
            }
        ),
        _os.path.join(rev, f),
    )
    fs2 = fsck_index(idx).to_pandas().set_index("scope")
    assert fs2.loc["__global__", "n_issues"] > 0
    assert "reverse lexicon" in fs2.loc["__global__", "issues"]


def test_reverse_lexicon_crash_window_is_harmless(ray_session, tmp_path):
    """A leftover tmp dir from a killed build_reverse_lexicon never
    affects readers (they only look at lexicon_rev/), and a rebuild
    publishes atomically over both the tmp and any previous sidecar."""
    import os as _os
    import shutil as _shutil

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher, build_reverse_lexicon

    d = tmp_path / "cw"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["window row"], pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "cw_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    # simulate a crash: partial tmp dir with a corrupt parquet
    stale = _os.path.join(idx, "lexicon_rev.tmp-99999")
    _os.makedirs(stale)
    with open(_os.path.join(stale, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    s = BM25Searcher(idx, num_shards=1)
    assert s.lexicon.wildcard_terms("*ow") == ["row", "window"]  # sweep path
    n = build_reverse_lexicon(idx)
    assert n == 2
    s2 = BM25Searcher(idx, num_shards=1)
    assert s2.lexicon.wildcard_terms("*ow") == ["row", "window"]  # probe path
    _shutil.rmtree(stale, ignore_errors=True)


def test_reverse_lexicon_publish_never_half_deleted(ray_session, tmp_path):
    """The publish is rename-aside (old -> .old-pid, tmp -> live, reap
    aside last), never rmtree-then-rename: at every intermediate state
    lexicon_rev/ is either a COMPLETE old sidecar, absent, or a COMPLETE
    new one — a reader can never glob a half-deleted dir that still
    passes isdir.  A stale aside dir from a killed pass is reaped by the
    next rebuild and is invisible to readers meanwhile."""
    import glob as _glob
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher, build_reverse_lexicon

    d = tmp_path / "pa"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["window row", "shadow crow"], pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "pa_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    build_reverse_lexicon(idx)
    want = ["crow", "row", "shadow", "window"]
    assert BM25Searcher(idx, num_shards=1).lexicon.wildcard_terms("*ow") == want

    # simulate a pass killed between the two renames: live sidecar moved
    # aside, new one not yet in place -> readers fall back to the sweep
    rev = _os.path.join(idx, "lexicon_rev")
    _os.rename(rev, rev + ".old-424242")
    assert BM25Searcher(idx, num_shards=1).lexicon.wildcard_terms("*ow") == want
    # the next rebuild publishes a complete sidecar and reaps the aside
    n = build_reverse_lexicon(idx)
    assert n == 4
    assert _glob.glob(rev + ".old-*") == [] and _glob.glob(rev + ".tmp-*") == []
    assert BM25Searcher(idx, num_shards=1).lexicon.wildcard_terms("*ow") == want
