"""Shingling, MinHash, SimHash — vectorized sketch functions.

MinHash/LSH constants mirror the reference detector
(``/root/reference/shingles/shingle.h:16-30``): 8-word shingles, 64 hash
functions mod 255 (byte signatures), 8 bands x 8 bytes, similarity
threshold 57/64 (0.90).  The universal-hash coefficient tables are
regenerated deterministically from a fixed seed (the reference's literal
``a``/``b`` tables are not copied); the FNV shingle hash follows the
published FNV-1a constants rather than the reference's FNV-1 variant.
"""

from __future__ import annotations

import numpy as np

SHINGLE_WORDS = 8          # shingle.h:27 NUM_WORDS_PER_SHINGLE
NUM_HASHES = 64            # shingle.h:16 signature length
NUM_BANDS = 8              # shingle.h:18
BAND_BYTES = NUM_HASHES // NUM_BANDS
SIM_THRESHOLD_BYTES = 57   # shingle.h:20-24: ceil(0.90 * 64)

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)

_rng = np.random.default_rng(0xC0FFEE)
_A = _rng.integers(1, 255, NUM_HASHES, dtype=np.uint64)   # mod-255 universal hashes
_B = _rng.integers(0, 255, NUM_HASHES, dtype=np.uint64)
_BIT_A = _rng.integers(1, 1 << 61, 64, dtype=np.uint64) | np.uint64(1)
_BIT_B = _rng.integers(0, 1 << 61, 64, dtype=np.uint64)


def fnv1a_tokens(token_ids: np.ndarray) -> np.ndarray:
    """FNV-1a over int64 token ids (8 bytes each) -> uint64 per token."""
    h = np.full(len(token_ids), _FNV_OFFSET, dtype=np.uint64)
    x = token_ids.astype(np.uint64)
    for shift in range(0, 64, 8):
        byte = (x >> np.uint64(shift)) & np.uint64(0xFF)
        h = (h ^ byte) * _FNV_PRIME
    return h


def hash_strings(tokens: list[str]) -> np.ndarray:
    """Stable uint64 hash per string (FNV-1a over utf-8 bytes)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = 14695981039346656037
        for b in t.encode():
            h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def md5_strings(tokens: list[str], cache: dict | None = None) -> np.ndarray:
    """uint64 per string: high 8 bytes of md5 (hex prefix) — chosen because
    DuckDB computes the identical value as ('0x'||substr(md5(s),1,16))::UBIGINT,
    making simhash/fingerprint pipelines SQL-oracle-checkable."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        v = cache.get(t) if cache is not None else None
        if v is None:
            v = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            if cache is not None:
                cache[t] = v
        out[i] = v
    return out


def shingle_hashes(token_hashes: np.ndarray, k: int = SHINGLE_WORDS) -> np.ndarray:
    """Rolling k-window combine of per-token hashes -> uint64 per shingle.

    Like the reference's ``createShingles`` (shingle.cpp:35-54): one hash
    per window, whole doc if shorter than k.
    """
    n = len(token_hashes)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    x = token_hashes.astype(np.uint64)
    if n < k:
        h = np.uint64(0)
        for v in x:
            h = (h * _FNV_PRIME) ^ v
        return np.array([h], dtype=np.uint64)
    # windowed polynomial combine, vectorized over all windows
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = (acc * _FNV_PRIME) ^ x[j : j + n - k + 1]
    return acc


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 universal hashes, min over shingles, low byte -> uint8[64].

    Vectorized form of the reference's ``sign`` (shingle.cpp:59-108) with
    one deliberate fix: the reference takes mins *mod 255*, which saturates
    to 0 for documents with >~500 shingles (every hash function's min over
    n uniform draws from [0,255) is 0 with probability ~1), collapsing all
    long documents into one cluster.  We take the min in 64-bit space and
    truncate to a byte afterwards: for unrelated docs each signature byte
    matches with p~=1/256, for Jaccard-J docs with p=J+(1-J)/256 — the
    57/64 (0.90) byte-similarity threshold keeps its intended semantics.
    """
    s = shingles.astype(np.uint64)
    vals = _BIT_A[:, None] * s[None, :] + _BIT_B[:, None]  # uint64 wraparound
    return (vals.min(axis=1) & np.uint64(0xFF)).astype(np.uint8)


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """8 band keys: each 8 signature bytes packed into one uint64."""
    return sig.reshape(NUM_BANDS, BAND_BYTES).astype(np.uint64) @ (
        np.full(BAND_BYTES, 256, dtype=np.uint64) ** np.arange(BAND_BYTES, dtype=np.uint64)
    )


def signature_similarity(a: np.ndarray, b: np.ndarray) -> int:
    return int((a == b).sum())


def simhash64(token_hashes: np.ndarray, weights: np.ndarray) -> np.uint64:
    """Weighted 64-bit SimHash of a token multiset."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    x = token_hashes.astype(np.uint64)
    bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    score = ((2 * bits - 1) * weights[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if score[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def simhash_segments(
    doc_idx: np.ndarray, token_hashes: np.ndarray, weights: np.ndarray, n_docs: int
) -> np.ndarray:
    """Per-doc weighted SimHash over flat (doc, token, weight) runs.

    Vectorized across the whole batch: one bincount per bit instead of a
    per-doc Python loop.  Bit b set iff sum(weight * (+1 if bit else -1))
    over the doc's tokens is > 0 — identical to :func:`simhash64`.
    """
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(token_hashes) == 0:
        return out
    x = token_hashes.astype(np.uint64)
    w = weights.astype(np.float64)
    for b in range(64):
        bit = ((x >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
        score = np.bincount(doc_idx, weights=(2.0 * bit - 1.0) * w, minlength=n_docs)
        out |= (score > 0).astype(np.uint64) << np.uint64(b)
    return out


def simhash_batch(list_of_token_hashes, list_of_weights) -> np.ndarray:
    return np.array(
        [simhash64(h, w) for h, w in zip(list_of_token_hashes, list_of_weights)],
        dtype=np.uint64,
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += _POPCOUNT8[((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.int64)]
    return cnt


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
