"""Posting-list packing: delta + varint blocks with skip/block-max metadata.

Replaces the reference's per-post append path (``/root/reference/
index.cpp:181-185`` ``appendDelta`` + ``index.h:276-281`` ``UpdateSeek``)
with a single vectorized pass over a whole hash partition of
``(term, salt, docID, tf)`` runs: one multi-key Arrow sort, one varint
encode of the entire partition, then NumPy ``reduceat`` slicing into
per-(term, block) rows.  No Python loop over postings.

Differences from the reference, by design (SURVEY.md §1.3):

- postings are (docID-gap, tf) varint *pairs* per document, not one varint
  per token occurrence — tf is materialized for BM25;
- skip entries every ``SKIP_INTERVAL`` postings carry block-max tf
  (the reference's powers-of-two seek table, ``index.h:271-281``, has no
  maxima and cannot drive block-max WAND);
- a term's postings may span multiple rows (``block_seq``) — hot-term salt
  ranges and the ``max_block_postings`` cap both introduce splits, so a
  stopword over 10^12 docs never materializes as one giant cell.

Output schema is FIXTURES.md §3: ``term, block_seq, df, cf, postings,
skips:list<struct<first_doc, offset, max_tf>>``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import varint

SKIP_INTERVAL = 128

SKIP_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("first_doc", pa.int64()),
            pa.field("offset", pa.int32()),
            pa.field("max_tf", pa.int32()),
        ]
    )
)

PACKED_SCHEMA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("block_seq", pa.int32()),
        pa.field("df", pa.int64()),
        pa.field("cf", pa.int64()),
        pa.field("postings", pa.binary()),
        pa.field("skips", SKIP_TYPE),
    ]
)

# positional layout: one extra varint stream per block — per-occurrence
# within-doc token positions, delta-coded with a reset (absolute value) at
# each posting's first occurrence, so any block decodes independently given
# its tfs.  The reference stores positions as deltas in one global position
# space (/root/reference/index.h:56-60, index.cpp:181-185); per-doc
# positions + the docID column carry the same information shard-locally.
PACKED_POS_SCHEMA = PACKED_SCHEMA.append(pa.field("positions", pa.binary()))


def pack_runs(table: pa.Table, max_block_postings: int = 1 << 17) -> pa.Table:
    """Pack a partition of (term, salt, docID, tf) runs into posting blocks.

    The partition may hold many terms; every (term, salt) group becomes one
    or more blocks (split again at ``max_block_postings``), docID-sorted.
    """
    if len(table) == 0:
        return PACKED_SCHEMA.empty_table()
    table = table.sort_by(
        [("term", "ascending"), ("salt", "ascending"), ("docID", "ascending")]
    )
    term = table["term"].combine_chunks()
    de = term.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    salt = table["salt"].to_numpy(zero_copy_only=False)
    doc = table["docID"].to_numpy(zero_copy_only=False)
    tf = table["tf"].to_numpy(zero_copy_only=False)
    return pack_sorted(codes, de.dictionary, salt, doc, tf, max_block_postings)


def _recompute_block_seq(t: pa.Table) -> pa.Table:
    """Recompute the within-term block_seq over concatenated packed tables."""
    de = t["term"].combine_chunks().dictionary_encode()
    bcodes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nblocks = len(bcodes)
    newterm = np.empty(nblocks, dtype=bool)
    newterm[0] = True
    newterm[1:] = bcodes[1:] != bcodes[:-1]
    idxb = np.arange(nblocks)
    term_first = idxb[newterm]
    block_seq = (idxb - term_first[np.cumsum(newterm) - 1]).astype(np.int32)
    i = t.schema.get_field_index("block_seq")
    return t.set_column(i, "block_seq", pa.array(block_seq, type=pa.int32()))


def _encode_positions(pos_flat: np.ndarray, occ_starts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Delta-code within-posting positions (absolute at each posting start)
    and varint-pack -> (flat uint8, cumulative byte offsets len m+1)."""
    m = len(pos_flat)
    p = pos_flat.astype(np.int64)
    dpos = np.empty(m, dtype=np.uint64)
    if m:
        dpos[1:] = (p[1:] - p[:-1]).astype(np.uint64)
        dpos[occ_starts] = p[occ_starts].astype(np.uint64)
    flat, lens = varint.encode(dpos)
    cum = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(lens, out=cum[1:])
    return flat, cum


def pack_sorted(
    codes: np.ndarray,
    dictionary: pa.Array,
    salt: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    max_block_postings: int = 1 << 17,
    max_bytes: int = int(np.iinfo(np.int32).max),
    pos: np.ndarray | None = None,
    style: np.ndarray | None = None,
    style_bits: int = 1,
) -> pa.Table:
    """Pack pre-sorted posting arrays (term-code, salt, docID ascending).

    ``codes`` index into ``dictionary`` (sorted-unique term strings not
    required — codes must merely be grouped and in final output order).

    ``style`` (per-posting style class, the reference's per-posting
    style/weight bits, ``/root/reference/index.h:44-49``): when given, the
    wire tf slot carries ``(tf << style_bits) | style`` — ``style_bits=1``
    is the 1-bit head flag, ``style_bits=2`` the reference's 4-class enum
    (Normal/Heading/Italic/Bold) — readers of a style-built index shift
    before scoring.  All block stats (df, cf, max_tf) stay in REAL tf so
    block-max pruning bounds remain valid (the query side multiplies the
    bound by the style weight).

    Partitions whose encoded postings exceed ``max_bytes`` (the pa.binary
    int32 offset ceiling) are split at block boundaries into byte-bounded
    segments and packed per segment — a stopword-heavy partition degrades
    to multiple tables, never an error.
    """
    n = len(doc)
    if n == 0:
        return PACKED_SCHEMA.empty_table()

    newblock = np.empty(n, dtype=bool)
    newblock[0] = True
    np.logical_or(codes[1:] != codes[:-1], salt[1:] != salt[:-1], out=newblock[1:])
    # split oversized (term, salt) groups at max_block_postings
    blk0 = np.cumsum(newblock) - 1
    starts0 = np.flatnonzero(newblock)
    off_in_blk = np.arange(n) - starts0[blk0]
    newblock |= (off_in_blk % max_block_postings == 0)

    block_starts = np.flatnonzero(newblock)
    nblocks = len(block_starts)
    block_id = np.cumsum(newblock) - 1

    gaps = np.empty(n, dtype=np.uint64)
    gaps[1:] = (doc[1:] - doc[:-1]).astype(np.uint64)
    gaps[newblock] = doc[newblock].astype(np.uint64)
    if n > 1 and (gaps[~newblock] == 0).any():
        raise ValueError("duplicate (term, docID) run — tokenizer must pre-aggregate tf")

    # every skip point restarts the delta chain with an absolute docID, so a
    # sub-block is independently decodable from its skip offset (random
    # access for block-max pruning; the reference's seek table serves the
    # same purpose via absolutePosition, /root/reference/index.h:276-281)
    block_id = np.cumsum(newblock) - 1
    block_starts_pre = np.flatnonzero(newblock)
    off_pre = np.arange(n) - block_starts_pre[block_id]
    reset = newblock | (off_pre % SKIP_INTERVAL == 0)
    gaps[reset] = doc[reset].astype(np.uint64)

    tf_wire = (
        ((tf.astype(np.uint64) << style_bits) | style.astype(np.uint64))
        if style is not None
        else tf.astype(np.uint64)
    )
    flat, lens = varint.pack_interleaved(gaps, tf_wire)
    cum = np.zeros(2 * n + 1, dtype=np.int64)
    np.cumsum(lens, out=cum[1:])
    if pos is not None:
        occ_cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tf, out=occ_cum[1:])
        pflat, pcum = _encode_positions(pos, occ_cum[:-1])
    if cum[-1] > max_bytes or (pos is not None and pcum[-1] > max_bytes):
        # split at block boundaries into byte-bounded segments; every block
        # start restarts the delta chain, so each segment is self-contained
        sb = cum[2 * block_starts]
        seg_end_bytes = np.append(sb[1:], cum[-1])
        if pos is not None:  # conservative: bound the sum of both streams
            psb = pcum[occ_cum[block_starts]]
            seg_end_bytes = seg_end_bytes + np.append(psb[1:], pcum[-1])
            sb = sb + psb
        bounds = [0]
        while block_starts[bounds[-1]] < n:
            base = sb[bounds[-1]]
            j = int(np.searchsorted(seg_end_bytes, base + max_bytes, side="right"))
            j = max(j, bounds[-1] + 1)  # always advance >= one block
            bounds.append(j)
            if j >= nblocks:
                break
        row_bounds = [int(block_starts[b]) if b < nblocks else n for b in bounds]
        if len(row_bounds) == 2 and row_bounds == [0, n]:
            # a single block already exceeds max_bytes: the split can't
            # subdivide below block granularity — recursing on identical
            # arguments would loop forever, so fail with the actual knob
            raise ValueError(
                f"one posting block encodes to more than max_bytes="
                f"{max_bytes} ({int(cum[-1])} posting bytes"
                + (f" + {int(pcum[-1])} position bytes" if pos is not None else "")
                + f" across {n} postings); lower max_block_postings "
                f"(currently {max_block_postings}) or raise max_bytes"
            )
        parts = [
            pack_sorted(
                codes[s:e], dictionary, salt[s:e], doc[s:e], tf[s:e],
                max_block_postings, max_bytes,
                pos[occ_cum[s] : occ_cum[e]] if pos is not None else None,
                style[s:e] if style is not None else None,
                style_bits,
            )
            for s, e in zip(row_bounds[:-1], row_bounds[1:])
        ]
        return _recompute_block_seq(pa.concat_tables(parts))

    # postings binary column: zero-copy offset slicing into the flat buffer
    bin_offsets = np.empty(nblocks + 1, dtype=np.int32)
    bin_offsets[:-1] = cum[2 * block_starts]
    bin_offsets[-1] = cum[-1]
    postings_arr = pa.Array.from_buffers(
        pa.binary(),
        nblocks,
        [None, pa.py_buffer(bin_offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )

    # skip entries: every SKIP_INTERVAL postings within a block
    skip_mask = newblock.copy()
    off_in_blk = np.arange(n) - block_starts[block_id]
    skip_mask |= (off_in_blk % SKIP_INTERVAL == 0)
    skip_pos = np.flatnonzero(skip_mask)
    skip_first_doc = doc[skip_pos]
    skip_offset = (cum[2 * skip_pos] - cum[2 * block_starts[block_id[skip_pos]]]).astype(
        np.int32
    )
    # max tf over [skip_i, skip_{i+1}) — block starts are skip points, so
    # reduceat segments never straddle a block boundary
    skip_max_tf = np.maximum.reduceat(tf, skip_pos).astype(np.int32)
    skip_block = block_id[skip_pos]
    skips_per_block = np.bincount(skip_block, minlength=nblocks)
    skip_list_offsets = np.zeros(nblocks + 1, dtype=np.int32)
    np.cumsum(skips_per_block, out=skip_list_offsets[1:])
    skip_struct = pa.StructArray.from_arrays(
        [
            pa.array(skip_first_doc, type=pa.int64()),
            pa.array(skip_offset, type=pa.int32()),
            pa.array(skip_max_tf, type=pa.int32()),
        ],
        names=["first_doc", "offset", "max_tf"],
    )
    skips_arr = pa.ListArray.from_arrays(pa.array(skip_list_offsets), skip_struct)

    # per-block stats + block_seq within term
    block_ends = np.append(block_starts[1:], n)
    df = (block_ends - block_starts).astype(np.int64)
    cf = np.add.reduceat(tf, block_starts).astype(np.int64)
    bcodes = codes[block_starts]
    newterm_b = np.empty(nblocks, dtype=bool)
    newterm_b[0] = True
    newterm_b[1:] = bcodes[1:] != bcodes[:-1]
    idxb = np.arange(nblocks)
    term_first = idxb[newterm_b]
    block_seq = (idxb - term_first[np.cumsum(newterm_b) - 1]).astype(np.int32)

    terms_per_block = dictionary.take(pa.array(bcodes, type=pa.int64()))
    cols = [
        terms_per_block,
        pa.array(block_seq, type=pa.int32()),
        pa.array(df, type=pa.int64()),
        pa.array(cf, type=pa.int64()),
        postings_arr,
        skips_arr,
    ]
    if pos is None:
        return pa.Table.from_arrays(cols, schema=PACKED_SCHEMA)
    pos_offsets = np.empty(nblocks + 1, dtype=np.int32)
    pos_offsets[:-1] = pcum[occ_cum[block_starts]]
    pos_offsets[-1] = pcum[-1]
    positions_arr = pa.Array.from_buffers(
        pa.binary(),
        nblocks,
        [None, pa.py_buffer(pos_offsets.tobytes()), pa.py_buffer(pflat.tobytes())],
    )
    return pa.Table.from_arrays(cols + [positions_arr], schema=PACKED_POS_SCHEMA)


BLOB_SCHEMA = pa.schema(
    [
        pa.field("term", pa.string()),
        pa.field("salt", pa.int32()),    # docID // salt_docs <= 2^26 at 10^12 docs
        pa.field("part", pa.int32()),
        pa.field("first_doc", pa.int64()),
        pa.field("df", pa.int32()),      # <= doc_batch
        pa.field("cf", pa.int32()),      # <= tokens per batch
        pa.field("blob", pa.binary()),
    ]
)


def encode_batch_blobs(
    codes: np.ndarray,
    doc: np.ndarray,
    tf: np.ndarray,
    salt: np.ndarray,
    pos: np.ndarray | None = None,
    style: np.ndarray | None = None,
    style_bits: int = 1,
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Per-batch combiner: pack (code, salt)-grouped postings into one blob
    per group — the map-side combine the north rule's "per-partition posting
    runs" calls for.

    Blob wire format (shuffle-internal): one varint stream per group.
    Without positions the stream is INTERLEAVED ``(doc-delta, tf)`` pairs
    (doc deltas from the row's first_doc, first = 0) — the merge side then
    extracts gaps/tfs as strided slices of the decoded array instead of two
    giant fancy-index gathers (the gathers were ~40% of the merge's memory
    traffic, the contended resource on this host class).  With positions the
    layout is grouped ``[df gaps][df tfs][cf absolute positions]`` per
    group.  Varints cut the shuffle to ~2-3 bytes/posting (vs 8 fixed-width)
    — at scale the exchange bytes ARE the cost; the merge side still decodes
    the whole partition in one vectorized pointer-jumping pass because
    concatenated valid streams form a valid stream with a known count.

    Inputs must be sorted by (code, salt, doc) (and ``pos`` aligned with the
    expanded occurrences).  Returns (group_starts, group_ends, blob array).
    """
    n = len(doc)
    if n == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            pa.array([], pa.binary()),
        )
    newg = np.empty(n, dtype=bool)
    newg[0] = True
    np.logical_or(codes[1:] != codes[:-1], salt[1:] != salt[:-1], out=newg[1:])
    starts = np.flatnonzero(newg)
    ends = np.append(starts[1:], n)
    gid = np.cumsum(newg) - 1
    rel = doc - doc[starts][gid]  # delta chain base: the group's first doc
    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = doc[1:] - doc[:-1]
    gaps[newg] = 0
    # style class (reference's per-posting style/weight marker,
    # /root/reference/index.h:44-49) rides the blob's tf slot as
    # (tf << style_bits) | style; df/cf stats stay REAL tf (caller-computed)
    tf_wire = (
        ((tf.astype(np.int64) << style_bits) | style.astype(np.int64))
        if style is not None
        else tf
    )
    if rel.max(initial=0) >= 1 << 32 or int(tf_wire.max(initial=0)) >= 1 << 32:
        raise ValueError(
            "docID span within one read batch must fit uint32 "
            "(use contiguous docIDs or a smaller doc_batch)"
        )
    m = len(pos) if pos is not None else 0
    total_slots = 2 * n + m
    df_g = ends - starts
    idx = np.arange(n)
    slots = np.empty(total_slots, dtype=np.uint64)
    if pos is None:
        slots[0::2] = gaps.astype(np.uint64)   # interleaved (gap, tf) pairs
        slots[1::2] = tf_wire.astype(np.uint64)
        gofs = np.empty(len(starts) + 1, dtype=np.int64)
        gofs[:-1] = 2 * starts
        gofs[-1] = 2 * n
    else:
        cf_g = np.add.reduceat(tf, starts)
        gofs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(2 * df_g + cf_g, out=gofs[1:])
        base = gofs[:-1]
        idx_in_g = idx - starts[gid]
        slots[base[gid] + idx_in_g] = gaps.astype(np.uint64)
        slots[base[gid] + df_g[gid] + idx_in_g] = tf_wire.astype(np.uint64)
        occ_excl = np.zeros(len(starts), dtype=np.int64)
        np.cumsum(cf_g[:-1], out=occ_excl[1:])
        ogid = np.repeat(np.arange(len(starts)), cf_g)
        oidx_in_g = np.arange(m) - occ_excl[ogid]
        if m and pos.max() >= 1 << 32:
            raise ValueError("token position must fit uint32")
        slots[base[ogid] + 2 * df_g[ogid] + oidx_in_g] = pos.astype(np.uint64)
    flat, lens = varint.leb128_encode(slots)
    cum_bytes = np.zeros(total_slots + 1, dtype=np.int64)
    np.cumsum(lens, out=cum_bytes[1:])
    if cum_bytes[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            "batch blob exceeds int32 offsets (~500M postings) — shrink doc_batch"
        )
    bin_offsets = cum_bytes[gofs].astype(np.int32)
    blob_arr = pa.Array.from_buffers(
        pa.binary(),
        len(starts),
        [None, pa.py_buffer(bin_offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )
    return starts, ends, blob_arr


def merge_blob_partition(
    group: pa.Table,
    max_block_postings: int = 1 << 17,
    positions: bool = False,
    style: int = 0,
) -> pa.Table:
    """Merge a hash partition of per-batch blobs into final posting blocks.

    One vectorized decode of the concatenated fixed-width stream (blobs from
    disjoint docID ranges concatenate into valid per-group streams), then
    :func:`pack_sorted` re-encodes with skip resets and block-max skips.
    ``style`` is the style WIDTH in bits (0 = none; bool True == 1 for the
    legacy head flag; 2 = the 4-class enum): blob tf slots are
    ``(tf << style) | class`` — split here so block stats stay real tf and
    the class bits re-ride the final wire.
    """
    if len(group) == 0:
        return (PACKED_POS_SCHEMA if positions else PACKED_SCHEMA).empty_table()
    if group.column(0).num_chunks > 1:
        # hash-shuffle partitions arrive as one chunk per map task; sorting
        # a many-chunked table is ~8x slower (per-row chunk lookups in the
        # take), so pay one memcpy up front
        group = group.combine_chunks()
    t = group.sort_by(
        [("term", "ascending"), ("salt", "ascending"), ("first_doc", "ascending")]
    )
    dfp = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    first_doc = t["first_doc"].to_numpy(zero_copy_only=False)
    total = int(dfp.sum())
    blob_col = t["blob"].combine_chunks()
    if blob_col.offset == 0 and blob_col.null_count == 0:
        offs = np.frombuffer(
            blob_col.buffers()[1], dtype=np.int32, count=len(blob_col) + 1
        )
        data = np.frombuffer(blob_col.buffers()[2], dtype=np.uint8)
        buf = np.ascontiguousarray(data[offs[0]:offs[-1]])
    else:  # fallback: copy via python (sliced/validity edge cases)
        buf = np.frombuffer(b"".join(blob_col.to_pylist()), dtype=np.uint8)
    # slot layout per blob row g: [df gaps][df tfs][cf positions?], LEB128;
    # concatenated valid streams form one valid stream with a known count
    cfp = t["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
    total_slots = int((2 * dfp + (cfp if positions else 0)).sum())
    vals = varint.leb128_decode(buf, total_slots).astype(np.int64)
    post_excl = np.zeros(len(dfp), dtype=np.int64)
    np.cumsum(dfp[:-1], out=post_excl[1:])
    pos_flat = None
    if positions:
        # grouped layout [df gaps][df tfs][cf positions]: gather per slot
        sizes = 2 * dfp + cfp
        base = np.zeros(len(dfp), dtype=np.int64)
        np.cumsum(sizes[:-1], out=base[1:])
        gid = np.repeat(np.arange(len(dfp)), dfp)
        idx_in_g = np.arange(total) - post_excl[gid]
        gaps = vals[base[gid] + idx_in_g]
        tfs = vals[base[gid] + dfp[gid] + idx_in_g]
        mtotal = int(cfp.sum())
        occ_excl = np.zeros(len(dfp), dtype=np.int64)
        np.cumsum(cfp[:-1], out=occ_excl[1:])
        ogid = np.repeat(np.arange(len(dfp)), cfp)
        oidx_in_g = np.arange(mtotal) - occ_excl[ogid]
        pos_flat = vals[base[ogid] + 2 * dfp[ogid] + oidx_in_g]
    else:
        # interleaved (gap, tf) pairs: strided slices, no gathers
        gaps = np.ascontiguousarray(vals[0::2])
        tfs = np.ascontiguousarray(vals[1::2])
    c = np.cumsum(gaps)
    starts = post_excl
    corrections = c[starts] - gaps[starts] - first_doc
    docs = c - np.repeat(corrections, dfp)

    row_codes = (
        t["term"].combine_chunks().dictionary_encode()
    )  # first-appearance codes == sorted group order
    codes = np.repeat(
        row_codes.indices.to_numpy(zero_copy_only=False).astype(np.int64), dfp
    )
    salts = np.repeat(t["salt"].to_numpy(zero_copy_only=False), dfp)
    sbits = None
    b = int(style)
    if b:
        sbits = tfs & ((1 << b) - 1)
        tfs = tfs >> b
    return pack_sorted(
        codes, row_codes.dictionary, salts, docs, tfs, max_block_postings,
        pos=pos_flat, style=sbits, style_bits=b,
    )


def unpack_positions(blob: bytes | np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Decode one block's positions stream -> flat absolute within-doc
    positions (len == tfs.sum()); each posting's run is delta-coded with an
    absolute first value, so this is a segmented cumsum."""
    buf = (
        np.frombuffer(blob, dtype=np.uint8)
        if isinstance(blob, (bytes, memoryview))
        else blob
    )
    m = int(tfs.sum())
    if m == 0:
        return np.empty(0, np.int64)
    dpos = varint.decode(buf, m).astype(np.int64)
    occ_starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=occ_starts[1:])
    c = np.cumsum(dpos)
    corrections = c[occ_starts] - dpos[occ_starts]
    return c - np.repeat(corrections, tfs)


def unpack_block(postings: bytes, df: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block -> (docIDs int64 ascending, tfs int64).

    The delta chain restarts (absolute docID) at every SKIP_INTERVAL-th
    posting, so docIDs are a segmented cumsum.
    """
    gaps, tfs = varint.unpack_postings(postings, df)
    g = gaps.astype(np.int64)
    c = np.cumsum(g)
    resets = np.arange(0, df, SKIP_INTERVAL)
    corrections = c[resets] - g[resets]
    seg_len = np.diff(np.append(resets, df))
    docs = c - np.repeat(corrections, seg_len)
    return docs, tfs.astype(np.int64)


def unpack_subblocks(
    postings: bytes | np.ndarray,
    df: int,
    skip_offsets: np.ndarray,
    which: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the selected sub-blocks of one posting block.

    ``skip_offsets`` are the per-sub-block byte offsets from the skips
    column; ``which`` is a sorted array of sub-block indices to decode.
    Returns (docIDs, tfs) concatenated over the selected sub-blocks.
    """
    buf = (
        np.frombuffer(postings, dtype=np.uint8)
        if isinstance(postings, (bytes, memoryview))
        else postings
    )
    counts = np.minimum(
        df - which * SKIP_INTERVAL, SKIP_INTERVAL
    )  # postings per selected sub-block
    docs_out = []
    tfs_out = []
    byte_ends = np.append(skip_offsets[1:], len(buf))
    for i, w in enumerate(which):
        seg = buf[skip_offsets[w]:byte_ends[w]]
        gaps, tfs = varint.unpack_postings(seg, int(counts[i]))
        docs_out.append(np.cumsum(gaps.astype(np.int64)))
        tfs_out.append(tfs.astype(np.int64))
    if not docs_out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(docs_out), np.concatenate(tfs_out)
