"""Unit tests for the varint codec (golden vectors from FIXTURES.md §4)."""

import numpy as np
import pytest

from index_ray.functions import varint


GOLDEN = [
    (6, bytes([0x86])),
    (1734, bytes([0xDB, 0x86])),
    # reference encoder quirk: continuation 0x2B lacks the 0x80 marker
    # (decoder masks low 6 bits, so 0xE0 0x2B 0x9C == 0xE0 0xAB 0x9C == 2780)
    (2780, bytes([0xE0, 0x2B, 0x9C])),
    (896512, bytes([0xF3, 0x9A, 0xB8, 0x80])),
]


def test_golden_encode():
    for value, blob in GOLDEN:
        if value == 2780:
            assert varint.encode_one(value) == bytes([0xE0, 0xAB, 0x9C])
            continue
        assert varint.encode_one(value) == blob, value


def test_golden_decode():
    for value, blob in GOLDEN:
        assert varint.decode_one(blob) == value


def test_0xfe_never_emitted():
    # 0xFE first byte is forbidden (/root/reference/index.cpp:176)
    vals = np.concatenate(
        [
            np.arange(0, 4096, dtype=np.uint64),
            np.uint64(1) << np.arange(0, 42, dtype=np.uint64),
            (np.uint64(1) << np.arange(1, 43, dtype=np.uint64)) - np.uint64(1),
        ]
    )
    flat, lens = varint.encode(vals)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    assert not (flat[starts] == 0xFE).any()


def test_roundtrip_random():
    rng = np.random.default_rng(42)
    # mix of magnitudes, heavy on small values like real gap streams
    vals = np.concatenate(
        [
            rng.integers(0, 64, 5000),
            rng.integers(0, 1 << 11, 2000),
            rng.integers(0, 1 << 21, 1000),
            rng.integers(0, 1 << 31, 500),
            rng.integers(0, varint.MAX_VALUE, 100, dtype=np.int64).astype(np.uint64),
        ]
    ).astype(np.uint64)
    rng.shuffle(vals)
    flat, lens = varint.encode(vals)
    assert lens.sum() == flat.size
    out = varint.decode(flat, len(vals))
    np.testing.assert_array_equal(out, vals)


def test_roundtrip_boundaries():
    edges = []
    for b in (7, 11, 16, 21, 26, 31, 42):
        edges += [(1 << b) - 1, (1 << b) % (varint.MAX_VALUE + 1)]
    vals = np.array([0, 1, 63, 64, 127, 128] + edges[:-1] + [varint.MAX_VALUE],
                    dtype=np.uint64)
    flat, _ = varint.encode(vals)
    np.testing.assert_array_equal(varint.decode(flat, len(vals)), vals)


def test_value_too_large():
    with pytest.raises(ValueError):
        varint.encode(np.array([varint.MAX_VALUE + 1], dtype=np.uint64))


def test_pack_unpack_postings():
    rng = np.random.default_rng(7)
    gaps = rng.integers(1, 10_000, 1000).astype(np.uint64)
    tfs = rng.integers(1, 50, 1000).astype(np.uint64)
    blob, offs = varint.pack_postings(gaps, tfs)
    g2, t2 = varint.unpack_postings(blob, 1000)
    np.testing.assert_array_equal(g2, gaps)
    np.testing.assert_array_equal(t2, tfs)
    # offsets point at each posting's gap varint: decoding from there works
    buf = np.frombuffer(blob, dtype=np.uint8)
    for i in (0, 1, 500, 999):
        v = varint.decode(buf[offs[i]:], 2)
        assert (v[0], v[1]) == (gaps[i], tfs[i])


def test_empty():
    flat, lens = varint.encode(np.empty(0, dtype=np.uint64))
    assert flat.size == 0
    assert varint.decode(flat, 0).size == 0


def test_leb128_roundtrip():
    import numpy as np

    from index_ray.functions.varint import leb128_decode, leb128_encode

    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.integers(0, 128, 100, dtype=np.uint64),
            rng.integers(0, 1 << 14, 100, dtype=np.uint64),
            rng.integers(0, 1 << 32, 100, dtype=np.uint64),
            np.array([0, 127, 128, (1 << 63) - 1], dtype=np.uint64),
        ]
    )
    flat, lens = leb128_encode(vals)
    assert int(lens.sum()) == len(flat)
    out = leb128_decode(flat, len(vals))
    assert out.tolist() == vals.tolist()
    # concatenated streams decode as one stream
    f2, _ = leb128_encode(vals[:7])
    f3, _ = leb128_encode(vals[7:20])
    both = leb128_decode(np.concatenate([f2, f3]), 20)
    assert both.tolist() == vals[:20].tolist()
