"""Tokenization for source-code / text corpora — vectorized over Arrow.

Replaces the reference's per-token C++ path (``/root/reference/index.cpp:
107-110`` ``lowerize``, ``/root/reference/stemmer/stemmer.cpp:89-113``
``standardize``) with batch-level Arrow kernels plus a per-*vocabulary-entry*
Python normalization (each distinct raw token is normalized once per worker
and memoized, never once per occurrence).

Two frozen tokenizer modes (SURVEY.md §7.4, FIXTURES.md):

``code``
    Split the raw text on non-identifier characters (``[^\\p{L}\\p{N}_]+``,
    RE2/unicode), then per distinct token: NFKD-normalize + casefold, keep
    only ``[a-z0-9_]`` (this also drops combining marks), then Porter-stem
    purely-alphabetic tokens.  Preserves ``snake_case`` identifiers that the
    reference's ``standardize`` (keep-set ``[a-z0-9]``,
    ``stemmer/stemmer.cpp:107-110``) would destroy.

``simple``
    ``lower(text)`` then split on ``[^a-z0-9]+`` — exactly expressible in
    ANSI SQL/DuckDB as ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``,
    used for the driver's oracle-checked queries.  No stemming.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .porter import stem

CODE_SEP_RE = r"[^\p{L}\p{N}_]+"
SIMPLE_SEP_RE = r"[^a-z0-9]+"

_ALLOWED = frozenset("abcdefghijklmnopqrstuvwxyz0123456789_")
_ALPHA = frozenset("abcdefghijklmnopqrstuvwxyz")


def normalize_code_token(tok: str) -> str | None:
    """NFKD + casefold + keep [a-z0-9_] + Porter-stem alphabetic tokens."""
    if tok.isascii():
        t = tok.lower()
        if not all(c in _ALLOWED for c in t):
            t = "".join(c for c in t if c in _ALLOWED)
    else:
        t = unicodedata.normalize("NFKD", tok).casefold()
        t = "".join(c for c in t if c in _ALLOWED)
    if not t:
        return None
    if all(c in _ALPHA for c in t):
        t = stem(t)
    return t


class TokenNormalizer:
    """Memoized per-worker token normalizer (state lives in the actor)."""

    def __init__(self, mode: str = "code", max_cache: int = 2_000_000):
        assert mode in ("code", "simple")
        self.mode = mode
        self.max_cache = max_cache
        self._cache: dict[str, str | None] = {}

    def __call__(self, tok: str) -> str | None:
        c = self._cache
        hit = c.get(tok, _MISS)
        if hit is not _MISS:
            return hit
        if self.mode == "code":
            out = normalize_code_token(tok)
        else:
            out = tok if tok else None  # simple mode pre-lowers and pre-splits
        if len(c) >= self.max_cache:
            c.clear()
        c[tok] = out
        return out


_MISS = object()


def split_tokens(texts: pa.Array | pa.ChunkedArray, mode: str) -> pa.ListArray:
    texts = pc.fill_null(texts, "")
    if mode == "simple":
        texts = pc.utf8_lower(texts)
        return pc.split_pattern_regex(texts, SIMPLE_SEP_RE)
    return pc.split_pattern_regex(texts, CODE_SEP_RE)


def tokenize_batch(
    texts: pa.Array | pa.ChunkedArray,
    normalizer: TokenNormalizer,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Tokenize a batch of documents.

    Returns ``(doc_idx, term_id, vocab)`` — one entry per surviving token
    occurrence in document order; ``vocab[term_id]`` is the normalized term.
    Fully vectorized except a loop over the batch's *distinct* raw tokens.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    la = split_tokens(texts, normalizer.mode)
    flat = la.flatten()
    counts = la.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    if len(flat) == 0:
        return doc_idx[:0], np.empty(0, dtype=np.int64), []
    de = flat.dictionary_encode()
    raw_vocab = de.dictionary.to_pylist()
    indices = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    vocab: list[str] = []
    vocab_ids: dict[str, int] = {}
    remap = np.empty(len(raw_vocab), dtype=np.int64)
    for i, rawtok in enumerate(raw_vocab):
        norm = normalizer(rawtok)
        if norm is None:
            remap[i] = -1
            continue
        tid = vocab_ids.get(norm)
        if tid is None:
            tid = len(vocab)
            vocab_ids[norm] = tid
            vocab.append(norm)
        remap[i] = tid
    term_id = remap[indices]
    keep = term_id >= 0
    return doc_idx[keep], term_id[keep], vocab


def doc_term_tf(
    texts: pa.Array | pa.ChunkedArray,
    normalizer: TokenNormalizer,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[str]]:
    """Per-(document, term) frequency for a batch.

    Returns ``(doc_idx, term_id, tf, vocab)`` with one row per distinct
    (document, term) pair; also usable for per-doc token counts via
    ``np.bincount(doc_idx, tf)``.
    """
    doc_idx, term_id, vocab = tokenize_batch(texts, normalizer)
    if len(doc_idx) == 0:
        return doc_idx, term_id, np.empty(0, dtype=np.int64), vocab
    v = max(len(vocab), 1)
    key = doc_idx * v + term_id
    uniq, tf = np.unique(key, return_counts=True)
    return uniq // v, uniq % v, tf.astype(np.int64), vocab


def doc_token_counts(
    texts: pa.Array | pa.ChunkedArray, normalizer: TokenNormalizer
) -> np.ndarray:
    """Number of surviving tokens per document (== sum of tf over terms)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    doc_idx, _, _ = tokenize_batch(texts, normalizer)
    return np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)
