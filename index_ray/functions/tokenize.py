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


# --- ASCII fast path -----------------------------------------------------
# Byte-LUT splitter, exact vs the regex spec when a batch is pure ASCII
# (checked per batch; non-ASCII batches take the RE2 path above):
#   code:   runs of [A-Za-z0-9_]  ==  split on [^\p{L}\p{N}_]+ for ASCII
#   simple: runs of [A-Za-z0-9] lowered per byte  ==  utf8_lower + split on
#           [^a-z0-9]+ (ASCII-only: no codepoint lowers INTO [a-z0-9])
# ~10x faster than RE2 here and allocation-light, which matters beyond raw
# speed: concurrent tokenize workers are memory-bandwidth-bound on this
# host class, so fewer intermediate copies per batch = better scaling.
_KEEP_CODE = np.zeros(256, dtype=bool)
_KEEP_SIMPLE = np.zeros(256, dtype=bool)
for _c in range(256):
    ch = chr(_c)
    if ch.isascii() and (ch.isalnum() or ch == "_"):
        _KEEP_CODE[_c] = True
        _KEEP_SIMPLE[_c] = ch != "_"
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[65:91] += 32


def _split_fast(texts: pa.Array, mode: str):
    """Return ``(flat_tokens: pa.StringArray, doc_of_token: np.ndarray)``
    for a utf8 batch, or ``None`` to fall back to the regex path.  ASCII
    docs take the byte-LUT path; the batch's few non-ASCII docs (if any)
    are regex-split and merged back in document order, so the token stream
    (content + order) is identical to ``split_tokens`` minus the empty
    strings the regex emits at doc edges (which normalization drops)."""
    if texts.type != pa.utf8():
        return None
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    bufs = texts.buffers()
    if bufs[2] is None:  # all-empty array
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    off0 = texts.offset
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=len(texts) + 1 + off0)[off0:]
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(offs[-1]))[int(offs[0]):]
    if data.size == 0:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    offs_rel = (offs - offs[0]).astype(np.int64)
    hi_pos = np.flatnonzero(data >= 0x80)
    if hi_pos.size:
        bad = np.unique(np.searchsorted(offs_rel, hi_pos, side="right") - 1)
        if bad.size > len(texts) // 2:  # mostly non-ASCII: regex the batch
            return None
    else:
        bad = None
    keep = (_KEEP_SIMPLE if mode == "simple" else _KEEP_CODE)[data]
    prev = np.empty_like(keep)
    prev[0] = False
    prev[1:] = keep[:-1]
    b = offs_rel[1:-1]  # interior doc boundaries: force token breaks
    bb = b[(b > 0) & (b < data.size)]
    prev[bb] = False
    nxt = np.empty_like(keep)
    nxt[-1] = False
    nxt[:-1] = keep[1:]
    b2 = b[b > 0]
    nxt[b2 - 1] = False
    start_idx = np.flatnonzero(keep & ~prev)
    if start_idx.size == 0 and bad is None:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    end_idx = np.flatnonzero(keep & ~nxt)
    lens = end_idx - start_idx + 1
    tok_data = data[keep]
    if mode == "simple":
        tok_data = _LOWER_LUT[tok_data]
    new_offs = np.zeros(start_idx.size + 1, dtype=np.int32)
    np.cumsum(lens, out=new_offs[1:])
    flat = pa.Array.from_buffers(
        pa.utf8(),
        start_idx.size,
        [None, pa.py_buffer(new_offs), pa.py_buffer(tok_data)],
    )
    doc_of_token = np.searchsorted(offs_rel, start_idx, side="right") - 1
    if bad is None:
        return flat, doc_of_token
    # merge: drop the LUT garbage for non-ASCII docs, regex-split those
    # docs, and stably interleave both streams back into document order
    good_tok = ~np.isin(doc_of_token, bad)
    flat = flat.filter(pa.array(good_tok))
    doc_of_token = doc_of_token[good_tok]
    la = split_tokens(texts.take(pa.array(bad)), mode)
    flat_b = la.flatten()
    counts_b = la.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    doc_b = bad[np.repeat(np.arange(bad.size), counts_b)]
    flat_all = pa.concat_arrays([flat, flat_b])
    doc_all = np.concatenate([doc_of_token, doc_b])
    order = np.argsort(doc_all, kind="stable")
    return flat_all.take(pa.array(order)), doc_all[order]


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
    fast = _split_fast(texts, normalizer.mode)
    if fast is not None:
        flat, doc_idx = fast
    else:
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
    # inlined normalizer memo (one dict probe per distinct raw token; a
    # method call per entry measurably shows up at this call rate)
    cache = normalizer._cache
    cget = cache.get
    vget = vocab_ids.get
    code_mode = normalizer.mode == "code"
    max_cache = normalizer.max_cache
    for i, rawtok in enumerate(raw_vocab):
        norm = cget(rawtok, _MISS)
        if norm is _MISS:
            norm = normalize_code_token(rawtok) if code_mode else (rawtok or None)
            if len(cache) >= max_cache:
                cache.clear()
            cache[rawtok] = norm
        if norm is None:
            remap[i] = -1
            continue
        tid = vget(norm)
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
