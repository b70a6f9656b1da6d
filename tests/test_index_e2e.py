"""End-to-end index tests: golden top-k, invariants, resume, parallelism
invariance (SURVEY.md §5.2)."""

import glob
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from index_ray.pipelines.build import BuildConfig, build_index, load_stats
from index_ray.pipelines.query import BM25Searcher
from index_ray.stages.pack import unpack_block

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _queries():
    return json.load(open(os.path.join(FIX, "queries.json")))


@pytest.fixture(scope="module")
def searcher(tiny_index_dir):
    return BM25Searcher(tiny_index_dir, num_shards=2)


@pytest.mark.parametrize("prune", [False, True])
def test_engine_matches_golden_and_oracle(searcher, tiny_oracle, prune):
    golden = json.load(open(os.path.join(FIX, "golden_topk.json")))
    for q in _queries():
        eng = searcher.search(q["query"], k=q["k"], prune=prune)
        orc = tiny_oracle.search(q["query"], k=q["k"])
        # engine == freshly-run oracle, bitwise scores
        assert eng["docID"].to_pylist() == orc["docID"].to_pylist(), q
        assert eng["score"].to_pylist() == orc["score"].to_pylist(), q
        # engine == committed golden (1e-9 tolerance per FIXTURES.md)
        g = golden[str(q["qid"])]
        assert eng["docID"].to_pylist() == [r["docID"] for r in g], q
        np.testing.assert_allclose(
            eng["score"].to_pylist(), [r["score"] for r in g], rtol=0, atol=1e-9
        )


def test_lm_dirichlet_matches_oracle(searcher, tiny_oracle):
    """Dirichlet LM ranking (second ranker over the same index) matches the
    brute-force LM oracle bitwise — docIDs AND float64 scores — including
    an all-absent-terms query (empty result path)."""
    queries = [q["query"] for q in _queries()] + ["zzznotaterm qqqnothere"]
    results = searcher.search_lm_many([(q, 10) for q in queries])
    for q, eng in zip(queries, results):
        orc = tiny_oracle.search_lm(q, k=10)
        assert eng["docID"].to_pylist() == orc["docID"].to_pylist(), q
        assert eng["score"].to_pylist() == orc["score"].to_pylist(), q
    assert len(results[-1]) == 0
    # LM and BM25 rank from the same postings but are different models:
    # on at least one fixture query the orders differ somewhere in top-10
    # (sanity that this isn't BM25 under a new name)
    diff = 0
    for q in queries[:-1]:
        bm = searcher.search(q, k=10)["docID"].to_pylist()
        lm = searcher.search_lm_many([(q, 10)])[0]["docID"].to_pylist()
        diff += bm != lm
    assert diff >= 1


def test_sha256_invariant(tiny_index_dir, tiny_corpus_table):
    # per-row content sha256 equality vs the source table (input_hint)
    dm = pq.read_table(
        glob.glob(os.path.join(tiny_index_dir, "chunks", "*", "docmap", "*.parquet"))
    )
    dm = dm.sort_by("docID")
    assert len(dm) == len(tiny_corpus_table)
    expected = [
        hashlib.sha256(s.encode()).hexdigest()
        for s in tiny_corpus_table["content"].to_pylist()
    ]
    assert dm["content_sha256"].to_pylist() == expected
    # docmap carries the full identity columns
    for col in ("repo", "path", "commit", "lang"):
        assert dm[col].to_pylist() == tiny_corpus_table[col].to_pylist()


def test_stats_invariants(tiny_index_dir):
    stats = load_stats(tiny_index_dir)
    lex = pq.read_table(glob.glob(os.path.join(tiny_index_dir, "lexicon", "*.parquet")))
    dm = pq.read_table(
        glob.glob(os.path.join(tiny_index_dir, "chunks", "*", "docmap", "*.parquet"))
    )
    # sum(cf) == total tokens == sum(doclen); df <= cf everywhere
    assert int(pa.compute.sum(lex["cf"]).as_py()) == stats["total_tokens"]
    assert int(pa.compute.sum(dm["n_tokens"]).as_py()) == stats["total_tokens"]
    assert stats["N"] == len(dm)
    df = np.asarray(lex["df"])
    cf = np.asarray(lex["cf"])
    assert (df <= cf).all() and (df >= 1).all()


def test_postings_sorted_and_docids_in_docmap(tiny_index_dir):
    dm = pq.read_table(
        glob.glob(os.path.join(tiny_index_dir, "chunks", "*", "docmap", "*.parquet"))
    )
    valid = set(dm["docID"].to_pylist())
    parts = glob.glob(os.path.join(tiny_index_dir, "chunks", "*", "parts", "*.parquet"))
    assert parts
    seen_blocks = 0
    for f in parts:
        t = pq.read_table(f)
        for r in t.to_pylist():
            docs, tfs = unpack_block(r["postings"], r["df"])
            assert (np.diff(docs) > 0).all(), r["term"]
            assert (tfs >= 1).all()
            assert set(docs.tolist()) <= valid
            seen_blocks += 1
    assert seen_blocks > 0


def test_hot_terms_salted(tiny_index_dir):
    stats = load_stats(tiny_index_dir)
    assert "def" in stats["hot_terms"] and "return" in stats["hot_terms"]
    parts = glob.glob(os.path.join(tiny_index_dir, "chunks", "*", "parts", "*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=["term", "block_seq"]) for f in parts])
    nblocks: dict = {}
    for term in t["term"].to_pylist():
        nblocks[term] = nblocks.get(term, 0) + 1
    # salt_docs=64 over ~100-doc chunks and 2 chunks => hot terms split into
    # multiple salted blocks (at least 2 per chunk)
    assert nblocks.get("def", 0) >= 4


def test_resume_rebuilds_only_invalid_chunk(tiny_corpus_dir, tmp_path):
    out = str(tmp_path / "idx")
    cfg = BuildConfig(chunk_docs=100, num_parts=4, salt_docs=64, batch_size=64)
    r1 = build_index(tiny_corpus_dir, out, cfg)
    assert r1.n_chunks == 2 and r1.chunks_skipped == 0

    c0 = os.path.join(out, "chunks", "chunk-00000")
    c1 = os.path.join(out, "chunks", "chunk-00001")
    before = {
        f: (os.path.getmtime(f), os.path.getsize(f))
        for f in glob.glob(os.path.join(c0, "**", "*"), recursive=True)
        if os.path.isfile(f)
    }
    shards_before = {
        os.path.basename(f): open(f, "rb").read()
        for f in glob.glob(os.path.join(c1, "parts", "*.parquet"))
    }
    os.remove(os.path.join(c1, "MANIFEST.json"))

    r2 = build_index(tiny_corpus_dir, out, cfg)
    assert r2.chunks_skipped == 1  # chunk 0 untouched, chunk 1 rebuilt
    after = {
        f: (os.path.getmtime(f), os.path.getsize(f))
        for f in glob.glob(os.path.join(c0, "**", "*"), recursive=True)
        if os.path.isfile(f)
    }
    assert before == after, "completed chunk was recomputed"
    shards_after = {
        os.path.basename(f): open(f, "rb").read()
        for f in glob.glob(os.path.join(c1, "parts", "*.parquet"))
    }
    assert set(shards_before) == set(shards_after)
    for name in shards_before:
        assert shards_before[name] == shards_after[name], f"{name} not byte-identical"


def test_parallelism_invariance(tiny_corpus_dir, tiny_index_dir, tmp_path, tiny_oracle):
    # different partitioning (num_parts, batch_size) => identical lexicon
    # and identical query results (deterministic docIDs + packing)
    out2 = str(tmp_path / "idx2")
    build_index(
        tiny_corpus_dir,
        out2,
        BuildConfig(chunk_docs=100, num_parts=2, salt_docs=64, batch_size=32),
    )
    lex1 = pq.read_table(
        glob.glob(os.path.join(tiny_index_dir, "lexicon", "*.parquet"))
    ).sort_by("term")
    lex2 = pq.read_table(glob.glob(os.path.join(out2, "lexicon", "*.parquet"))).sort_by(
        "term"
    )
    assert lex1.equals(lex2)
    s2 = BM25Searcher(out2, num_shards=1)
    for q in _queries():
        eng = s2.search(q["query"], k=q["k"])
        orc = tiny_oracle.search(q["query"], k=q["k"])
        assert eng["docID"].to_pylist() == orc["docID"].to_pylist()
        assert eng["score"].to_pylist() == orc["score"].to_pylist()


def test_shuffle_fallbacks_match_bucket(tiny_corpus_dir, tmp_path, tiny_oracle):
    """The Dataset-native shuffle fallbacks ('sort': range-sort shuffle,
    'hash': streaming hash exchange) must produce search results identical
    to the default custom bucket shuffle — they are the documented escape
    hatch if the raw-task dispatch loop ever misbehaves on a new Ray."""
    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher

    from conftest import TINY_CFG

    results = {}
    for mode in ["bucket", "sort", "hash"]:
        out = str(tmp_path / f"idx_{mode}")
        build_index(tiny_corpus_dir, out, BuildConfig(shuffle=mode, **TINY_CFG))
        s = BM25Searcher(out, num_shards=2)
        rs = s.search_many(
            [("parse http request", 10), ("connection", 10), ("def return value", 10)]
        )
        results[mode] = [
            (r["docID"].to_pylist(), r["score"].to_pylist()) for r in rs
        ]
    assert results["sort"] == results["bucket"]
    assert results["hash"] == results["bucket"]
    # and all three equal the brute-force oracle bitwise
    for qi, q in enumerate(["parse http request", "connection", "def return value"]):
        o = tiny_oracle.search(q, k=10)
        assert results["bucket"][qi][0] == o["docID"].to_pylist()
        assert results["bucket"][qi][1] == o["score"].to_pylist()


def test_search_after_pages_equal_topk(searcher):
    """Concatenated cursor pages == one deep top-k, bitwise; past-the-end
    cursor returns empty."""
    for q in ["parse http request", "connection", "def return value"]:
        full = searcher.search(q, k=23, prune=True)
        pages, cursor = [], None
        for _ in range(10):
            r = searcher.search_after(q, k=7, after=cursor)
            if len(r) == 0:
                break
            pages.append(r)
            cursor = (
                float(r["score"][len(r) - 1].as_py()),
                int(r["docID"][len(r) - 1].as_py()),
            )
            if len(r) < 7:
                break
        got_docs = [d for p in pages for d in p["docID"].to_pylist()][:23]
        got_scores = [s for p in pages for s in p["score"].to_pylist()][:23]
        assert got_docs == full["docID"].to_pylist()
        assert got_scores == full["score"].to_pylist()  # bitwise across pages
    # cursor past the last result -> empty page
    tail = searcher.search("connection", k=10_000).to_pandas()
    last = (float(tail["score"].iloc[-1]), int(tail["docID"].iloc[-1]))
    assert len(searcher.search_after("connection", k=5, after=last)) == 0


def test_search_weighted_semantics(searcher):
    """weight 1.0 == plain search bitwise; duplicate entries double-count;
    down-weighting scales contributions."""
    q = "parse http request"
    from index_ray.pipelines.query import query_terms

    terms = query_terms(q, "code")
    plain = searcher.search(q, k=10)
    w1 = searcher.search_weighted([(t, 1.0) for t in terms], k=10)
    assert w1["docID"].to_pylist() == plain["docID"].to_pylist()
    assert w1["score"].to_pylist() == plain["score"].to_pylist()

    # one term listed twice == that term at weight 2 (UNION ALL semantics)
    twice = searcher.search_weighted(
        [(terms[0], 1.0), (terms[0], 1.0)], k=5
    )
    double = searcher.search_weighted([(terms[0], 2.0)], k=5)
    assert twice["docID"].to_pylist() == double["docID"].to_pylist()
    assert twice["score"].to_pylist() == double["score"].to_pylist()

    # single-term scores scale linearly with the weight
    one = searcher.search_weighted([(terms[0], 1.0)], k=5)
    assert double["score"].to_pylist() == [2 * s for s in one["score"].to_pylist()]


def test_search_filtered_matches_postfilter(searcher, tiny_corpus_table):
    """Filtered top-k == post-filter of a deep unfiltered search: same
    membership rule, UNCHANGED scores (the filter must not touch
    N/avgdl/idf), and empty filter set -> empty result."""
    langs = tiny_corpus_table["lang"].to_pylist()
    allowed = {"python", "java"}
    allowed_ids = {i for i, lg in enumerate(langs) if lg in allowed}
    for q in ["parse http request", "connection"]:
        deep = searcher.search(q, k=10_000, prune=False)
        want = [
            (d, s)
            for d, s in zip(deep["docID"].to_pylist(), deep["score"].to_pylist())
            if d in allowed_ids
        ][:10]
        got = searcher.search_filtered(
            q, k=10, filter_col="lang", filter_vals=sorted(allowed)
        )
        assert list(zip(got["docID"].to_pylist(), got["score"].to_pylist())) == want
    assert len(searcher.search_filtered("connection", k=5, filter_vals=[])) == 0


def test_synonym_expansion_equals_typed_disjunction(searcher):
    """Synonym expansion == the user typing the expanded disjunction:
    bitwise identical docIDs and scores (per-term idf semantics)."""
    syn = {"connection": ["socket"], "parse": ["decode", "zzzabsent"]}
    r1 = searcher.search_synonyms_many([("parse connection", 10)], syn)[0]
    r2 = searcher.search("parse connection socket decode zzzabsent", k=10)
    assert r1["docID"].to_pylist() == r2["docID"].to_pylist()
    assert r1["score"].to_pylist() == r2["score"].to_pylist()
    # no synonym map: plain search
    r3 = searcher.search_synonyms_many([("parse connection", 10)], {})[0]
    r4 = searcher.search("parse connection", k=10)
    assert r3["score"].to_pylist() == r4["score"].to_pylist()


def test_collapse_matches_postfilter(searcher, tiny_index_dir):
    """Field collapsing == post-filtering the FULL ranked list with a
    per-group cap (bitwise scores) — including groups that would flood
    an uncollapsed top-k."""
    dm = pa.concat_tables(
        [
            pq.read_table(f, columns=["docID", "lang"])
            for f in glob.glob(
                os.path.join(tiny_index_dir, "chunks", "*", "docmap", "*.parquet")
            )
        ]
    )
    lang_of = dict(zip(dm["docID"].to_pylist(), dm["lang"].to_pylist()))
    for q, cap in [("parse connection", 2), ("def return value", 1)]:
        full = searcher.search(q, k=10**6, prune=False)
        seen: dict = {}
        want = []
        for d, s in zip(full["docID"].to_pylist(), full["score"].to_pylist()):
            g = lang_of[d]
            if seen.get(g, 0) < cap:
                seen[g] = seen.get(g, 0) + 1
                want.append((d, s, str(g)))
            if len(want) == 10:
                break
        got = searcher.search_collapse_many([(q, 10)], "lang", cap=cap)[0]
        assert got["docID"].to_pylist() == [d for d, _, _ in want], q
        assert got["score"].to_pylist() == [s for _, s, _ in want], q
        assert got["group"].to_pylist() == [g for _, _, g in want], q
        # cap actually binds: every group count <= cap
        from collections import Counter

        c = Counter(got["group"].to_pylist())
        assert max(c.values()) <= cap


def test_term_vectors_sidecar(ray_session, tiny_corpus_dir, tiny_corpus_table, tmp_path):
    """term_vectors=True writes tvec/ forward-index sidecars whose (doc,
    term, tf) rows equal a brute-force tokenize of the same docs; a build
    without the flag raises a clear error."""
    import collections

    import pytest as _pytest

    from conftest import TINY_CFG
    from index_ray.functions.tokenize import TokenNormalizer, tokenize_batch
    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import term_vectors

    idx = str(tmp_path / "tv_idx")
    build_index(
        tiny_corpus_dir, idx, BuildConfig(term_vectors=True, **TINY_CFG)
    )
    probe = [0, 7, 42, 199]
    got = term_vectors(idx, probe).to_pandas()
    texts = tiny_corpus_table["content"].to_pylist()
    norm = TokenNormalizer("code")
    for d in probe:
        import pyarrow as _pa

        docc, tid, vocab = tokenize_batch(_pa.array([texts[d]]), norm)
        want = collections.Counter(vocab[t] for t in tid)
        sub = got[got["docID"] == d]
        assert dict(zip(sub["term"], sub["tf"])) == dict(want)
    idx2 = str(tmp_path / "no_tv_idx")
    build_index(tiny_corpus_dir, idx2, BuildConfig(**TINY_CFG))
    with _pytest.raises(FileNotFoundError):
        term_vectors(idx2, probe)
