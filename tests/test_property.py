"""Hypothesis property tests for the foundational kernels every pipeline
rests on: the varint wire codec, the tokenizer's parity with the SQL
oracle regex, Arrow line-split parity with DuckDB string_split, the
per-group bottom-k, and the shared sessionization bounds."""

import re

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings, strategies as st

from index_ray.functions import varint

# one shared in-process DuckDB for the parity tests
_CON = duckdb.connect()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=int(varint.MAX_VALUE)),
        max_size=200,
    )
)
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    flat, lens = varint.encode(v)
    assert int(lens.sum()) == len(flat)
    out = varint.decode(flat, len(v))
    assert out.tolist() == values


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 40)), max_size=100),
    st.lists(st.integers(min_value=1, max_value=1 << 20), max_size=100),
)
def test_postings_pack_roundtrip(gaps, tfs):
    m = min(len(gaps), len(tfs))
    g = np.array(gaps[:m], dtype=np.uint64)
    t = np.array(tfs[:m], dtype=np.uint64)
    blob, offs = varint.pack_postings(g, t)
    g2, t2 = varint.unpack_postings(blob, m)
    assert g2.tolist() == g.tolist()
    assert t2.tolist() == t.tolist()
    # offsets point at each posting's gap varint (strictly increasing)
    assert len(offs) == m
    if m > 1:
        assert (np.diff(offs) > 0).all()


_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=80, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_simple_tokenizer_matches_sql_regex(texts):
    """TokenNormalizer('simple') must agree with the exact DuckDB expression
    every SQL oracle inlines: regexp_split_to_array(lower(text), '[^a-z0-9]+')
    with empties dropped — the cornerstone of the whole oracle suite."""
    from index_ray.functions.tokenize import TokenNormalizer, tokenize_batch

    norm = TokenNormalizer("simple")
    d, tid, vocab = tokenize_batch(pa.array(texts, pa.string()), norm)
    engine = [[] for _ in texts]
    for di, ti in zip(d, tid):
        engine[di].append(vocab[ti])

    for i, s in enumerate(texts):
        rows = _CON.execute(
            "SELECT list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'),"
            " x -> x <> '')",
            [s],
        ).fetchone()[0]
        assert engine[i] == rows, (s, engine[i], rows)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.sampled_from(["a", "bb", "", "c c", "\t"]), max_size=6))
def test_line_split_matches_sql(parts):
    """pc.split_pattern(text, '\\n') == DuckDB string_split(text, chr(10)),
    including the empty-text -> one-empty-line edge."""
    s = "\n".join(parts)
    arrow = pc.split_pattern(pa.array([s]), pattern="\n")[0].as_py()
    sql = _CON.execute(
        "SELECT string_split(?, chr(10))", [s]
    ).fetchone()[0]
    assert arrow == sql == s.split("\n")


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # group
            st.integers(min_value=0, max_value=1 << 40),  # priority
        ),
        max_size=120,
    ),
    st.integers(min_value=1, max_value=8),
)
def test_g_bottomk_matches_bruteforce(rows, k):
    from index_ray.pipelines.curation import _g_bottomk

    g = np.array([f"g{a}" for a, _ in rows], dtype=object)
    pr = np.array([p for _, p in rows], dtype=np.uint64)
    ids = np.arange(len(rows), dtype=np.int64)
    sel = _g_bottomk(g, ids, pr, k) if len(rows) else np.array([], np.int64)

    want = set()
    for grp in set(g.tolist()):
        members = [i for i in range(len(rows)) if g[i] == grp]
        members.sort(key=lambda i: (pr[i], ids[i]))
        want.update(members[:k])
    assert set(sel.tolist()) == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=10_000),  # ts (us)
        ),
        min_size=1,
        max_size=80,
    ),
    st.integers(min_value=1, max_value=2_000),
)
def test_session_bounds_match_bruteforce(rows, gap_us):
    from index_ray.pipelines.events import _session_bounds

    rows = sorted(rows)
    u = np.array([a for a, _ in rows], dtype=np.int64)
    t = np.array([b for _, b in rows], dtype=np.int64)
    starts, ends, seq = _session_bounds(u, t, gap_us)

    # brute force: walk rows, new session on user change or gap > gap_us
    exp = []  # (start_idx, end_idx, seq)
    per_user = {}
    for i in range(len(rows)):
        new = i == 0 or u[i] != u[i - 1] or t[i] - t[i - 1] > gap_us
        if new:
            per_user[u[i]] = per_user.get(u[i], 0) + 1
            exp.append([i, i, per_user[u[i]]])
        else:
            exp[-1][1] = i
    assert starts.tolist() == [e[0] for e in exp]
    assert ends.tolist() == [e[1] for e in exp]
    assert seq.tolist() == [e[2] for e in exp]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["", "+", "-"]),
            st.text(alphabet="abcz", min_size=1, max_size=5),
            st.sampled_from(["", "*", "~"]),
        ),
        max_size=8,
    )
)
def test_parse_dsl_partitions_every_token(tokens):
    """Every whitespace token lands in exactly one clause list, whatever
    the sign/suffix combination (suffix markers bind tighter than signs)."""
    from index_ray.pipelines.query import parse_dsl

    q = " ".join(f"{s}{t}{m}" for s, t, m in tokens)
    p = parse_dsl(q)
    total = sum(
        len(p[k]) for k in ("opt", "req", "exc", "prefix", "fuzzy", "fields")
    )
    assert total == len(tokens)
    assert not p["phrases"]


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=2, max_value=10),   # docs
    st.integers(min_value=2, max_value=8),    # vocab size
    st.integers(min_value=50, max_value=95),  # threshold pct
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_allpairs_prefix_filter_recall(n_docs, n_terms, pct, seed):
    """The AllPairs suffix-bound recall theorem, fuzzed: for ANY weighted
    corpus and ANY fixed global term order, every pair with cosine >= t
    must share at least one term emitted by BOTH sides of
    prefix_emit_mask (linkage.py docstring has the proof this pins)."""
    from index_ray.pipelines.linkage import prefix_emit_mask

    rng = np.random.default_rng(seed)
    t = pct / 100.0
    # sparse nonneg weights; some zero rows/cols allowed
    w = rng.random((n_docs, n_terms)) * (rng.random((n_docs, n_terms)) < 0.6)
    norms = np.sqrt((w * w).sum(axis=1))
    live = norms > 0
    nw = np.zeros_like(w)
    nw[live] = w[live] / norms[live][:, None]
    maxw = nw.max(axis=0)
    # build the sorted (doc, term) rows the kernel expects (term order =
    # a random permutation — the theorem holds for any fixed order)
    perm = rng.permutation(n_terms)
    emitted = {}
    for d in range(n_docs):
        terms = np.flatnonzero(w[d] > 0)
        if len(terms) == 0:
            emitted[d] = set()
            continue
        order = terms[np.argsort(perm[terms])]
        contrib = nw[d][order] * maxw[order]
        keep = prefix_emit_mask(np.zeros(len(order), np.int64), contrib, t)
        emitted[d] = set(order[keep].tolist())
    cos = nw @ nw.T
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            if cos[a, b] >= t:
                assert emitted[a] & emitted[b], (
                    f"pair ({a},{b}) cos={cos[a, b]:.3f} lost by the "
                    f"prefix filter"
                )


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40)), max_size=120
    ),
    tile=st.sampled_from([1, 2, 3, 8]),
)
def test_tile_emit_equals_bruteforce_pairs(rows, tile):
    """For ANY (key, id) multiset and ANY tile edge, the bounded tile
    emitter followed by expansion yields exactly the per-key brute-force
    triu pair multiset (each key's distinct-id pairs once per key — the
    multiplicity the gram-Jaccard count shuffle depends on)."""
    import numpy as np

    import index_ray.util as U

    t = pa.table(
        {
            "k": pa.array([k for k, _ in rows], pa.int64()),
            "doc_id": pa.array([i for _, i in rows], pa.int64()),
        }
    )
    saved = U.MAX_TILE
    U.MAX_TILE = tile  # manual patch: @given reuses function-scoped fixtures
    try:
        got = U._expand_tiles(U._tiles_in_bucket(t, ["k"]))
    finally:
        U.MAX_TILE = saved
    got_pairs = sorted(zip(got["a"].to_pylist(), got["b"].to_pylist()))

    want = []
    by_key = {}
    for k, i in rows:
        by_key.setdefault(k, set()).add(i)
    for ids in by_key.values():
        s = sorted(ids)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                want.append((s[x], s[y]))
    assert got_pairs == sorted(want)
    if got["a"].to_pylist():
        assert (got["a"].to_numpy() < got["b"].to_numpy()).all()
