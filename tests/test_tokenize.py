"""Tokenizer unit tests: unicode normalization, identifiers, tf counting."""

import numpy as np
import pyarrow as pa

from index_ray.functions.tokenize import (
    TokenNormalizer,
    doc_term_tf,
    doc_token_counts,
    normalize_code_token,
    tokenize_batch,
)


def _terms(texts, mode="code"):
    norm = TokenNormalizer(mode)
    doc_idx, term_id, vocab = tokenize_batch(pa.array(texts), norm)
    return [[vocab[t] for t in term_id[doc_idx == d]] for d in range(len(texts))]


def test_identifiers_preserved():
    [toks] = _terms(["def snake_case(x): return x_1 + CamelCase"])
    assert "snake_case" in toks
    assert "x_1" in toks
    assert "camelcas" in toks  # lowered (not split), then Porter step-5a drops the e


def test_stemming_applied_to_alpha_tokens():
    [toks] = _terms(["connections connected running files"])
    assert toks == ["connect", "connect", "run", "file"]


def test_unicode_nfkd_casefold():
    # accents stripped via NFKD + combining-mark drop
    assert normalize_code_token("café") == "cafe"
    assert normalize_code_token("naïve") == "naiv"  # then Porter-stemmed
    assert normalize_code_token("ÉCOLE") == "ecol"
    # pure CJK tokens vanish (keep-set is [a-z0-9_])
    assert normalize_code_token("日本語") is None


def test_simple_mode_matches_sql_semantics():
    # lower + split [^a-z0-9]+ — underscores are separators, no stemming
    [toks] = _terms(["Foo_bar BAZ-42 connections"], mode="simple")
    assert toks == ["foo", "bar", "baz", "42", "connections"]


def test_doc_term_tf():
    norm = TokenNormalizer("simple")
    d, t, tf, vocab = doc_term_tf(pa.array(["a b a b a", "b c"]), norm)
    got = {(int(di), vocab[ti]): int(f) for di, ti, f in zip(d, t, tf)}
    assert got == {(0, "a"): 3, (0, "b"): 2, (1, "b"): 1, (1, "c"): 1}


def test_doc_token_counts_and_empty_docs():
    norm = TokenNormalizer("code")
    counts = doc_token_counts(pa.array(["one two three", "", None, "日本語", "x"]), norm)
    np.testing.assert_array_equal(counts, [3, 0, 0, 0, 1])


def test_empty_batch():
    norm = TokenNormalizer("code")
    d, t, vocab = tokenize_batch(pa.array([], type=pa.string()), norm)
    assert len(d) == 0 and len(t) == 0 and vocab == []


def test_normalizer_cache_consistent():
    norm = TokenNormalizer("code")
    a = norm("Connections")
    b = norm("Connections")
    assert a == b == "connect"


def test_ascii_fast_path_matches_regex_path(monkeypatch):
    """The byte-LUT fast splitter must be token-for-token identical to the
    RE2 path after normalization, across ASCII/mixed/non-ASCII batches,
    empties, underscores, and sliced (offset != 0) arrays."""
    import numpy as np
    import pyarrow as pa

    import index_ray.functions.tokenize as tk

    rng = np.random.default_rng(7)
    pieces = [
        "", "   ", "_", "__x__", "Foo_bar42", "snake_case_id", "UPPER lower",
        "tab\tsep|chars!", "héllo wörld", "naïve café", "中文分词 test",
        "mix中ed ascii部分", "a" * 300, "0123 4567_89", "ß sharp", "éacc",
    ]
    docs = ["".join(rng.choice(pieces, size=rng.integers(0, 6))) for _ in range(80)]
    docs += pieces  # each piece alone as a doc
    for arr in (pa.array(docs, pa.string()), pa.array(docs, pa.string()).slice(3, 60)):
        for mode in ("code", "simple"):
            fast = tk.tokenize_batch(arr, tk.TokenNormalizer(mode))
            with monkeypatch.context() as m:
                m.setattr(tk, "_split_fast", lambda *_: None)
                slow = tk.tokenize_batch(arr, tk.TokenNormalizer(mode))
            f_toks = [fast[2][t] for t in fast[1]]
            s_toks = [slow[2][t] for t in slow[1]]
            assert f_toks == s_toks, mode
            assert fast[0].tolist() == slow[0].tolist(), mode
