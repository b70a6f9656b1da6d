"""Custom UTF-8-style varint codec, vectorized with NumPy.

Wire format recovered from the reference's golden artifact (see
``/root/reference/index.h:63-74`` ``Post::get_bytes`` and SURVEY.md App. A.3):
the number of leading 1-bits of the first byte gives the total byte count
(0 leading ones => 1 byte, ASCII form); the first byte contributes its bits
below the prefix, each continuation byte contributes its low 6 bits,
big-endian composition.

Canonical encoder (ours):

==========  ===========================  ==============
value        first byte                   total bytes
==========  ===========================  ==============
0..63        ``0b10xxxxxx``               1
64..127      ``0b0xxxxxxx`` (ASCII)       1
<2^11        ``0b110xxxxx``               2
<2^16        ``0b1110xxxx``               3
<2^21        ``0b11110xxx``               4
<2^26        ``0b111110xx``               5
<2^31        ``0b1111110x``               6
<2^42        ``0xFF``                     8
==========  ===========================  ==============

``0xFE`` as a first byte is forbidden (the reference encoder rejects it,
``/root/reference/index.cpp:176``), so the 7-byte form is unused; values in
[2^31, 2^42) jump straight to the 8-byte ``0xFF`` form.  2^42 - 1 is the
codec ceiling — enough for docID deltas in a 10^12-document corpus.

Golden vectors (testPL): 6<->0x86, 1734<->0xdb86, 2780<->0xe02b9c,
896512<->0xf39ab880.

Decoding a packed stream is sequential by nature (each varint's start
depends on the previous lengths).  ``decode`` stays vectorized via pointer
jumping: a per-byte "length if this byte were a start" LUT gives a successor
array ``nxt[i] = i + len(i)``; repeated squaring of ``nxt`` yields
advance-by-2^k tables, and each varint start is reached by composing the
binary decomposition of its index — O(n log n) NumPy gathers, no Python
loop over postings.
"""

from __future__ import annotations

import numpy as np

MAX_VALUE = (1 << 42) - 1

# ---- LUTs -----------------------------------------------------------------


def _leading_ones(b: int) -> int:
    n = 0
    while n < 8 and (b << n) & 0x80:
        n += 1
    return n


# byte length of a varint given its first byte (leading ones; 0 -> 1 byte)
_LEN_LUT = np.array([max(1, _leading_ones(b)) for b in range(256)], dtype=np.int64)

# payload contributed by the first byte, by its value
_PAYLOAD0_LUT = np.empty(256, dtype=np.uint64)
for _b in range(256):
    _n = max(1, _leading_ones(_b))
    if _n == 1:
        _mask = 0x7F if _b < 0x80 else 0x3F
    else:
        _mask = (1 << max(0, 7 - _n)) - 1
    _PAYLOAD0_LUT[_b] = _b & _mask

# encoder length thresholds: index i (0-based) => length i+1 while v < bound
_BOUNDS = np.array(
    [1 << 7, 1 << 11, 1 << 16, 1 << 21, 1 << 26, 1 << 31], dtype=np.uint64
)
_BOUNDS32 = _BOUNDS.astype(np.uint32)  # all bounds fit: 2^31 < 2^32
_PREFIX = np.array([0, 0, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC, 0, 0xFF], dtype=np.uint8)


def encoded_lengths(values: np.ndarray) -> np.ndarray:
    """Byte length of each value under the canonical encoding."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size and v.max() > MAX_VALUE:
        raise ValueError(f"varint value exceeds {MAX_VALUE}")
    lens = np.searchsorted(_BOUNDS, v, side="right") + 1
    # values needing 7 bytes (>= 2^31) use the 8-byte 0xFF form (0xFE forbidden)
    lens[lens == 7] = 8
    return lens


def encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array -> (flat uint8 stream, per-value byte lengths).

    Allocation-lean: writes straight into the output stream via one scatter
    per byte *position* (first bytes for all values at once, then the k-th
    continuation byte of every value long enough — posting data is ~99%
    single-byte, so the k>=1 passes touch almost nothing).  Values are
    narrowed to uint32 when they fit (<2^31, i.e. <=6 encoded bytes), which
    halves the gather/shift memory traffic — the contended resource when
    many workers encode concurrently.
    """
    if getattr(values, "dtype", None) == np.uint32:
        v = np.ascontiguousarray(values)
        lens = np.searchsorted(_BOUNDS32, v, side="right") + 1
        lens[lens == 7] = 8
        if v.size and int(v.max()) >= (1 << 31):
            v = v.astype(np.uint64)  # 8-byte form shifts past 32 bits
    else:
        v = np.ascontiguousarray(values, dtype=np.uint64)
        lens = encoded_lengths(v)
        if v.size and int(v.max()) < (1 << 31):
            v = v.astype(np.uint32)
    starts = np.empty(v.size + 1, dtype=np.int64)
    starts[0] = 0
    np.cumsum(lens, out=starts[1:])
    out = np.empty(int(starts[-1]), dtype=np.uint8)
    if v.size == 0:
        return out, lens
    m3f = v.dtype.type(0x3F)
    m80 = v.dtype.type(0x80)
    six = v.dtype.type(6)
    sh = six * (lens - 1).astype(v.dtype)
    first = (v >> sh).astype(np.uint8) | _PREFIX[lens]
    one = (lens == 1) & (v < 64)
    first[one] = (v[one] | m80).astype(np.uint8)
    out[starts[:-1]] = first
    for k in range(1, int(lens.max())):
        sel = np.flatnonzero(lens > k)
        shk = six * (lens[sel] - 1 - k).astype(v.dtype)
        out[starts[sel] + k] = (((v[sel] >> shk) & m3f) | np.uint8(0x80)).astype(
            np.uint8
        )
    return out, lens


def decode(buf: np.ndarray, count: int) -> np.ndarray:
    """Decode ``count`` varints from a uint8 stream -> uint64 array.

    Vectorized pointer-jumping start resolution; see module docstring.
    """
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    n = buf.size
    lens_all = _LEN_LUT[buf]
    nxt = np.minimum(np.arange(n, dtype=np.int64) + lens_all, n)
    nxt = np.append(nxt, n)  # absorbing end state
    starts = np.zeros(count, dtype=np.int64)
    idx = np.arange(count, dtype=np.int64)
    jump = nxt  # advance-by-2^k table, k starts at 0
    k = 0
    while (1 << k) <= count - 1:
        sel = ((idx >> k) & 1) == 1
        if sel.any():
            starts[sel] = jump[starts[sel]]
        jump = jump[jump]
        k += 1
    if count > 1 and starts[-1] >= n:
        raise ValueError("varint stream truncated")
    b0 = buf[starts]
    lens = _LEN_LUT[b0]
    val = _PAYLOAD0_LUT[b0].copy()
    for k in range(1, 8):
        sel = lens > k
        if not sel.any():
            break
        val[sel] = (val[sel] << np.uint64(6)) | (
            buf[starts[sel] + k] & np.uint64(0x3F)
        )
    return val


# ---- LEB128 (shuffle-internal wire) -----------------------------------------
#
# The FINAL shard format stays the reference-derived custom codec above.
# The shuffle-internal blob wire uses standard little-endian LEB128 instead:
# unlike the reference codec (whose continuation bytes are indistinguishable
# from starts, forcing O(n log n) pointer-jumping start resolution), LEB128
# is self-synchronizing — a byte starts a varint iff the previous byte's high
# bit is clear — so a whole shuffle partition decodes in ONE O(n) vectorized
# pass (mask + cumsum + add.reduceat).

_LEB_BOUNDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def leb128_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode uint64 array -> (flat LEB128 uint8 stream, per-value lens)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    lens = np.searchsorted(_LEB_BOUNDS, v, side="right") + 1
    starts = np.empty(v.size + 1, dtype=np.int64)
    starts[0] = 0
    np.cumsum(lens, out=starts[1:])
    out = np.empty(int(starts[-1]), dtype=np.uint8)
    if v.size and int(v.max()) < (1 << 31):
        v = v.astype(np.uint32)  # halve gather/shift traffic (7*k <= 28)
    sh = v.dtype.type(7)
    m7f = v.dtype.type(0x7F)
    maxlen = int(lens.max()) if v.size else 0
    for k in range(maxlen):
        sel = np.flatnonzero(lens > k)
        byte = ((v[sel] >> (sh * v.dtype.type(k))) & m7f).astype(np.uint8)
        cont = (lens[sel] > k + 1).astype(np.uint8) << 7
        out[starts[sel] + k] = byte | cont
    return out, lens


def leb128_decode(buf: np.ndarray, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints from a uint8 stream — O(n), no jumps.

    Start positions come from one comparison pass (a byte starts a varint
    iff the previous byte's high bit is clear); values accumulate with one
    gather per byte *position* — posting streams are ~99% single-byte, so
    the k>=1 passes touch almost nothing (3x less memory traffic than the
    per-byte shift + reduceat formulation this replaces)."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    starts_mask = np.empty(buf.size, dtype=bool)
    starts_mask[0] = True
    np.less(buf[:-1], 0x80, out=starts_mask[1:])
    starts = np.flatnonzero(starts_mask)
    if len(starts) != count:
        raise ValueError(f"LEB128 stream has {len(starts)} values, expected {count}")
    lens = np.diff(np.append(starts, buf.size))
    out = (buf[starts] & np.uint8(0x7F)).astype(np.uint64)
    for k in range(1, int(lens.max())):
        sel = np.flatnonzero(lens > k)
        byte = (buf[starts[sel] + k] & np.uint8(0x7F)).astype(np.uint64)
        out[sel] |= byte << np.uint64(7 * k)
    return out


def encode_one(value: int) -> bytes:
    flat, _ = encode(np.array([value], dtype=np.uint64))
    return flat.tobytes()


def decode_one(data: bytes) -> int:
    return int(decode(np.frombuffer(data, dtype=np.uint8), 1)[0])


# ---- posting-specific packing ---------------------------------------------


def pack_interleaved(doc_gaps: np.ndarray, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interleave (gap, tf) pairs and varint-pack -> (flat uint8, per-varint lens).

    Stages the interleave as uint32 when both columns fit (<2^31, true for
    any corpus below ~2G docs per shard) — halves the staging traffic."""
    m = len(doc_gaps)
    small = m == 0 or (
        int(doc_gaps.max()) < (1 << 31) and int(tfs.max()) < (1 << 31)
    )
    vals = np.empty(2 * m, dtype=np.uint32 if small else np.uint64)
    vals[0::2] = doc_gaps
    vals[1::2] = tfs
    return encode(vals)


def pack_postings(doc_gaps: np.ndarray, tfs: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Interleave (gap, tf) pairs and varint-pack.

    Returns (blob bytes, byte offset of each posting's gap varint) — the
    offsets feed the skip table (FIXTURES.md §3).
    """
    m = len(doc_gaps)
    vals = np.empty(2 * m, dtype=np.uint64)
    vals[0::2] = doc_gaps
    vals[1::2] = tfs
    flat, lens = encode(vals)
    offsets = np.zeros(2 * m, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return flat.tobytes(), offsets[0::2]


def unpack_postings(blob: bytes | np.ndarray, count: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_postings` -> (doc_gaps, tfs), uint64."""
    buf = np.frombuffer(blob, dtype=np.uint8) if isinstance(blob, (bytes, memoryview)) else blob
    vals = decode(buf, 2 * count)
    return vals[0::2], vals[1::2]
