"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's online near-dup registry (``ShingleMap``,
``/root/reference/shingles/shingle.h:108-116`` — one mutable in-process
band table) becomes an *offline* Ray Data pipeline (SURVEY.md §2.7 D1/D2):

    sign per batch -> explode (band, band_hash, doc_id, sig)
    -> groupby(band, band_hash) -> verify inside the group -> unique pairs

No shared mutable state; band buckets are the shuffle key (uniform FNV
hashes).  Within a bucket, docs with *identical* signatures are linked
linearly (min-doc to each) instead of pairwise — an exact-duplicate bucket
of size g costs O(g), not O(g^2); only near-identical signatures get the
pairwise byte comparison, capped at ``MAX_BUCKET`` with a log line.

Scale note: the pair-verify for n-gram Jaccard runs distributed over pair
partitions (``map_batches``), with the candidate gram-set blocks shared
through the object store (each verify worker reads them once); at 10^12
scale, when even the candidate sets outgrow one worker, the same verify
becomes a hash-partitioned pair join on doc_id — the bucket/verify
structure is unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions import minhash as mh
from ..functions.tokenize import TokenNormalizer, tokenize_batch
from ..util import pairs_table, stage_fn
from .text import docs_dataset

import logging

_LOG = logging.getLogger(__name__)

MAX_BUCKET = 512  # pairwise-verify tile edge (memory bound, not a result cap)


# ---------------------------------------------------------------- exact ----


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Groups of byte-identical texts: (content_sha256, keeper, n_dups).

    keeper = min doc_id of the group (the reference crawler's "first seen
    wins" semantics made deterministic).
    """
    import hashlib

    def add_sha(batch: pa.Table) -> pa.Table:
        sha = [hashlib.sha256(s.encode()).hexdigest() for s in batch["text"].to_pylist()]
        return pa.table(
            {"content_sha256": pa.array(sha, pa.string()), "doc_id": batch["doc_id"]}
        )

    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(add_sha, batch_format="pyarrow")
        .groupby("content_sha256")
        .aggregate(Min("doc_id", alias_name="keeper"), Count(alias_name="n_docs"))
    )


# ------------------------------------------------------------- minhash ----


class _SignStage:
    """batch -> (doc_id, band, band_hash, sig) x NUM_BANDS rows."""

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, vocab = tokenize_batch(batch[self.text_col], self.norm)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vhash = mh.hash_strings(vocab)
        n = len(batch)
        doc_ids, bands, bhashes, sigs = [], [], [], []
        token_hashes = vhash[tid] if len(tid) else np.empty(0, np.uint64)
        starts = np.searchsorted(d, np.arange(n))
        ends = np.searchsorted(d, np.arange(n), side="right")
        for i in range(n):
            th = token_hashes[starts[i]:ends[i]]
            sig = mh.minhash_signature(mh.shingle_hashes(th))
            bh = mh.band_hashes(sig)
            doc_ids.extend([int(ids[i])] * mh.NUM_BANDS)
            bands.extend(range(mh.NUM_BANDS))
            bhashes.extend(bh.view(np.int64).tolist())
            sigs.extend([sig.tobytes()] * mh.NUM_BANDS)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(bhashes, pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


def _pairs_from_bucket(group: pa.Table) -> pa.Table:
    """Verified near-dup pairs within one (band, band_hash) bucket.

    Identical signatures are linked linearly (min-doc to each member, O(g));
    distinct signatures get the pairwise byte-similarity verify, computed in
    MAX_BUCKET x MAX_BUCKET tiles so oversized buckets are fully verified
    with bounded memory (a warning is logged — at 10^12 scale an oversized
    bucket signals a band needing a secondary salt, never silent loss).
    """
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    sigs = np.frombuffer(b"".join(group["sig"].to_pylist()), dtype=np.uint8).reshape(
        len(group), mh.NUM_HASHES
    )[order]
    # identical signatures: link min-doc linearly (exact-dup fast path)
    uniq, inv = np.unique(sigs, axis=0, return_inverse=True)
    order2 = np.argsort(inv, kind="stable")  # stable: ids stay ascending per group
    sorted_inv, sorted_ids = inv[order2], ids[order2]
    grp_starts = np.searchsorted(sorted_inv, np.arange(len(uniq)))
    reps = sorted_ids[grp_starts]  # min docID per signature group
    is_first = np.zeros(len(ids), dtype=bool)
    is_first[grp_starts] = True
    a_parts = [reps[sorted_inv[~is_first]]]
    b_parts = [sorted_ids[~is_first]]
    # near-identical: pairwise across distinct signatures, tiled
    u = len(uniq)
    if u > MAX_BUCKET:
        _LOG.warning(
            "LSH bucket with %d distinct signatures (> %d) — tiled pairwise verify",
            u, MAX_BUCKET,
        )
    for i0 in range(0, u, MAX_BUCKET):
        ablk = uniq[i0 : i0 + MAX_BUCKET]
        for j0 in range(i0, u, MAX_BUCKET):
            bblk = uniq[j0 : j0 + MAX_BUCKET]
            eq = (ablk[:, None, :] == bblk[None, :, :]).sum(axis=2)
            ii, jj = np.where(eq >= mh.SIM_THRESHOLD_BYTES)
            gi, gj = ii + i0, jj + j0
            keep = gi < gj
            gi, gj = gi[keep], gj[keep]
            a_parts.append(np.minimum(reps[gi], reps[gj]))
            b_parts.append(np.maximum(reps[gi], reps[gj]))
    return pa.table(
        {
            "a": pa.array(np.concatenate(a_parts), pa.int64()),
            "b": pa.array(np.concatenate(b_parts), pa.int64()),
        }
    )


def minhash_pairs_ds(sf_dir: str, mode: str = "simple") -> ray.data.Dataset:
    """Near-dup pair Dataset (a, b), a < b, possibly duplicated across bands."""
    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(stage_fn(_SignStage, mode), batch_format="pyarrow",
                     batch_size=256)
        .groupby(["band", "band_hash"])
        .map_groups(_pairs_from_bucket, batch_format="pyarrow")
    )


def minhash_dedup(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Near-duplicate pairs (a < b), reference LSH constants, sorted/unique."""
    return pairs_table(minhash_pairs_ds(sf_dir, mode))


def min_label_propagation(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Connected components over an edge list via iterative min-label
    propagation — fully vectorized (no per-edge Python loop), converges in
    O(log diameter) rounds.  Each round is a scatter-min over edges + one
    pointer-jumping pass; the identical rounds run as a (key, min) groupby
    at cluster scale, so this is the distributable formulation (unlike
    union-find, whose parent array is inherently sequential).

    Returns (members ascending, representative label per member).
    """
    members, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(members), dtype=np.int64)
    while True:
        prev = label.copy()
        # scatter-min across edges, both directions
        np.minimum.at(label, ea, label[eb])
        np.minimum.at(label, eb, label[ea])
        # pointer jumping: label <- label[label] until stable
        while True:
            nxt = label[label]
            if (nxt == label).all():
                break
            label = nxt
        if (label == prev).all():
            break
    return members, members[label]


def minhash_exact_consistency(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Cross-check: every byte-identical (sha-equal) duplicate group must
    land in ONE minhash cluster — identical texts have identical signatures,
    so the LSH path can never split them.

    Returns one row (n_dup_sha_groups, n_groups_split); the SQL oracle
    recomputes the group count and pins n_groups_split = 0 — a one-sided
    containment check of the exact-dup relation inside the minhash output.
    """
    import hashlib

    clusters = minhash_clusters(sf_dir, mode)
    rep = dict(
        zip(clusters["doc_id"].to_pylist(), clusters["cluster_rep"].to_pylist())
    )

    def add_sha(batch: pa.Table) -> pa.Table:
        sha = [hashlib.sha256(s.encode()).hexdigest() for s in batch["text"].to_pylist()]
        return pa.table(
            {"content_sha256": pa.array(sha, pa.string()), "doc_id": batch["doc_id"]}
        )

    sha = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(add_sha, batch_format="pyarrow")
        .to_pandas()
    )
    n_groups = n_split = 0
    for _, docs in sha.groupby("content_sha256")["doc_id"]:
        if len(docs) > 1:
            n_groups += 1
            if len({rep.get(int(d), int(d)) for d in docs}) > 1:
                n_split += 1
    return pa.table(
        {
            "n_dup_sha_groups": pa.array([n_groups], pa.int64()),
            "n_groups_split": pa.array([n_split], pa.int64()),
        }
    )


CC_DRIVER_MAX_PAIRS = 200_000  # below this the in-memory path wins outright


def _h2m_mix(k: np.ndarray, m: np.ndarray) -> np.ndarray:
    """64-bit mix of (key, member) rows — splitmix-style finalizer."""
    h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h ^= m.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return h


_CC_EMPTY = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})


def _cc_init(t: pa.Table) -> pa.Table:
    """Edge batch (a, b) -> state rows (u, v)."""
    if t.num_rows == 0:  # schema-less empty blocks reach map fns too
        return _CC_EMPTY
    return pa.table({"u": t["a"].cast(pa.int64()), "v": t["b"].cast(pa.int64())})


def _cc_both_dirs(t: pa.Table) -> pa.Table:
    """State batch -> both directions, so a bucket keyed on ``u`` holds the
    FULL neighborhood of each of its nodes (large-star's grouping)."""
    if t.num_rows == 0:
        return _CC_EMPTY
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "u": pa.array(np.concatenate([u, v]), pa.int64()),
            "v": pa.array(np.concatenate([v, u]), pa.int64()),
        }
    )


def _cc_orient(t: pa.Table) -> pa.Table:
    """State batch -> (max, min) orientation (small-star's grouping)."""
    if t.num_rows == 0:
        return _CC_EMPTY
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    return pa.table(
        {"u": pa.array(np.maximum(u, v), pa.int64()),
         "v": pa.array(np.minimum(u, v), pa.int64())}
    )


def _cc_dedupe(t: pa.Table):
    """Bucket rows -> (u, v, group starts, counts) with self-loops dropped,
    (u, v) deduped, sorted by u."""
    if t.num_rows == 0:  # may even be schema-less (empty-block fan-out)
        z = np.empty(0, np.int64)
        return z, z, z, z
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    keep = u != v
    if not keep.all():
        u, v = u[keep], v[keep]
    if len(u) == 0:
        return u, v, u, u
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    u, v = uv[:, 0], uv[:, 1]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    counts = np.diff(np.r_[starts, len(u)])
    return u, v, starts, counts


def _ls_bucket(t: pa.Table) -> pa.Table:
    """Large-star over one bucket (all both-direction rows of its ``u``
    keys): for each node u with neighborhood Γ(u) and m = min(Γ(u) ∪ {u}),
    emit (w, m) for every neighbor w > u.  Kiveris et al., "Connected
    Components in MapReduce and Beyond" — LS preserves connectivity and
    never grows the edge set (each undirected edge yields exactly one
    output edge, from its smaller endpoint's group)."""
    u, v, starts, counts = _cc_dedupe(t)
    if len(u) == 0:
        return _CC_EMPTY
    m = np.minimum(np.minimum.reduceat(v, starts), u[starts])
    minv = np.repeat(m, counts)
    sel = v > u
    return pa.table(
        {"u": pa.array(v[sel], pa.int64()), "v": pa.array(minv[sel], pa.int64())}
    )


def _ss_bucket(t: pa.Table) -> pa.Table:
    """Small-star over one bucket of (max, min)-oriented rows: for each
    node u with smaller-neighbors N and m = min(N), emit (u, m) plus
    (w, m) for every w ∈ N \\ {m} — rewires u's star onto its minimum."""
    u, v, starts, counts = _cc_dedupe(t)
    if len(u) == 0:
        return _CC_EMPTY
    m = np.minimum.reduceat(v, starts)
    minv = np.repeat(m, counts)
    sel = v != minv
    return pa.table(
        {
            "u": pa.array(np.concatenate([u[starts], v[sel]]), pa.int64()),
            "v": pa.array(np.concatenate([m, minv[sel]]), pa.int64()),
        }
    )


def _cc_stats(t: pa.Table) -> pa.Table:
    """Per-batch (row count, checksum-partial) for the fixpoint test."""
    if t.num_rows == 0:
        return pa.table({"n": pa.array([0], pa.int64()), "chk": pa.array([0], pa.int64())})
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    chk = int(_h2m_mix(u, v).sum(dtype=np.uint64) % np.uint64(1 << 31))
    return pa.table(
        {"n": pa.array([t.num_rows], pa.int64()), "chk": pa.array([chk], pa.int64())}
    )


def _cc_self_rows(t: pa.Table) -> pa.Table:
    """State batch -> (u, v) plus (v, v), so every node (incl. component
    minima, which only ever appear on the v side) gets a label row."""
    if t.num_rows == 0:
        return _CC_EMPTY
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "u": pa.array(np.concatenate([u, v]), pa.int64()),
            "v": pa.array(np.concatenate([v, v]), pa.int64()),
        }
    )


def _cc_labels(t: pa.Table) -> pa.Table:
    """Star-state bucket -> (doc_id, cluster_rep) via per-node min partner."""
    if t.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "cluster_rep": pa.array([], pa.int64())}
        )
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    return pa.table(
        {
            "doc_id": pa.array(u[starts], pa.int64()),
            "cluster_rep": pa.array(np.minimum.reduceat(v, starts), pa.int64()),
        }
    )


def cc_clusters(
    edges: ray.data.Dataset,
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Distributed connected components over an edge Dataset (a, b).

    Alternating large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): each half-round is ONE bucket
    shuffle (``util.hash_groupby``) + a vectorized per-bucket star rewrite
    — no driver-resident edge list, no join, and the edge set never grows
    (unlike hash-to-min, which blows up exponentially on high-diameter
    graphs — measured: a 10^4-node path reached 10^8 state rows by round
    12; LS/SS converges on the same input in ~7 rounds at ≤2·|E| rows).
    Converges to stars: every node points at its component minimum.  The
    fixpoint test compares (row count, multiset checksum) of successive
    small-star outputs — both steps are deterministic functions of the
    canonical edge set, so equal successive stats mean the state is final.

    Returns a Dataset of (doc_id, cluster_rep), one row per node.
    """
    from ..util import hash_groupby

    state = edges.map_batches(_cc_init, batch_format="pyarrow").materialize()
    n_edges = state.count()
    if n_edges == 0:
        return ray.data.from_arrow(_cc_labels(_CC_EMPTY))
    if num_partitions is None:
        # every round pays per-bucket task overhead; size buckets to the
        # edge volume (>=100k state rows per reduce task), capped at the
        # session's usual cpus//2 so big graphs still use the machine
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(max(8, cpus // 2), 1 + n_edges // 100_000))
    prev: tuple | None = None
    for _ in range(max_rounds):
        both = state.map_batches(_cc_both_dirs, batch_format="pyarrow")
        state = hash_groupby(both, ["u"], _ls_bucket, num_partitions)
        oriented = state.map_batches(_cc_orient, batch_format="pyarrow")
        state = hash_groupby(oriented, ["u"], _ss_bucket, num_partitions).materialize()
        stats = (
            state.map_batches(_cc_stats, batch_format="pyarrow").to_pandas().sum()
        )
        cur = (int(stats["n"]), int(stats["chk"]))
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"cc_clusters: no fixpoint within {max_rounds} rounds")
    with_self = state.map_batches(_cc_self_rows, batch_format="pyarrow")
    return hash_groupby(with_self, ["u"], _cc_labels, num_partitions)


def minhash_clusters(
    sf_dir: str, mode: str = "simple", distributed: bool | None = None
) -> pa.Table:
    """Connected components over the near-dup pairs: (doc_id, cluster_rep).

    Small pair sets (< CC_DRIVER_MAX_PAIRS) collapse on the driver with the
    vectorized ``min_label_propagation``; larger ones run the distributed
    ``cc_clusters`` rounds so no edge list ever materializes in one process.
    """
    pairs_ds = minhash_pairs_ds(sf_dir, mode).materialize()
    if distributed is None:
        distributed = pairs_ds.count() > CC_DRIVER_MAX_PAIRS
    if distributed:
        df = (
            cc_clusters(pairs_ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(df, preserve_index=False)
    pairs = pairs_table(pairs_ds)
    a = pairs["a"].to_numpy(zero_copy_only=False)
    b = pairs["b"].to_numpy(zero_copy_only=False)
    members, rep = min_label_propagation(a, b)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_rep": pa.array(rep, pa.int64()),
        }
    )


# ------------------------------------------------------------- simhash ----

SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3


class _SimhashStage:
    """batch -> (doc_id, band, band_val, simhash) x 4 rows.

    Hamming <= 3 over 64 bits guarantees one of the 4 16-bit bands matches
    exactly (pigeonhole) — the blocking key, with FULL recall vs the
    all-pairs join.  Token hashes are md5-high-64 so a DuckDB oracle can
    recompute the identical simhash values; token-less docs are skipped
    (the SQL group-by drops them).
    """

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col
        self._md5_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import doc_term_tf

        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        vhash = mh.md5_strings(vocab, self._md5_cache)
        keep_docs = np.zeros(len(batch), dtype=bool)
        keep_docs[d] = True
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(batch)
        # per-bit weighted scores via one bincount per bit over the flat
        # (doc, term, tf) runs — no per-doc slicing (d is sorted by doc)
        th = vhash[tid] if len(tid) else np.empty(0, np.uint64)
        sh = mh.simhash_segments(d, th, tf, n)
        ids, sh = ids[keep_docs], sh[keep_docs]
        n = len(ids)
        bands = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int32), n)
        ids_rep = np.repeat(ids, SIMHASH_BANDS)
        sh_rep = np.repeat(sh, SIMHASH_BANDS)
        vals = (sh_rep >> (np.uint64(16) * bands.astype(np.uint64))) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(ids_rep, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_val": pa.array(vals.astype(np.int64), pa.int64()),
                "simhash": pa.array(sh_rep, pa.uint64()),
            }
        )


def _simhash_pairs(group: pa.Table) -> pa.Table:
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    sh = group["simhash"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, sh = ids[order], sh[order]
    n = len(ids)
    a_parts, b_parts = [], []
    if n > MAX_BUCKET:
        _LOG.warning("simhash bucket with %d members (> %d) — tiled verify", n, MAX_BUCKET)
    for i0 in range(0, n, MAX_BUCKET):
        for j0 in range(i0, n, MAX_BUCKET):
            ham = mh.hamming64(
                sh[i0 : i0 + MAX_BUCKET, None], sh[None, j0 : j0 + MAX_BUCKET]
            )
            ii, jj = np.where(ham <= SIMHASH_MAX_HAMMING)
            gi, gj = ii + i0, jj + j0
            keep = (gi < gj) & (ids[gi] != ids[gj])
            a_parts.append(np.minimum(ids[gi[keep]], ids[gj[keep]]))
            b_parts.append(np.maximum(ids[gi[keep]], ids[gj[keep]]))
    a = np.concatenate(a_parts) if a_parts else np.empty(0, np.int64)
    b = np.concatenate(b_parts) if b_parts else np.empty(0, np.int64)
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def simhash_dedup(sf_dir: str, mode: str = "simple") -> pa.Table:
    ds = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(stage_fn(_SimhashStage, mode), batch_format="pyarrow",
                     batch_size=256)
        .groupby(["band", "band_val"])
        .map_groups(_simhash_pairs, batch_format="pyarrow")
    )
    return pairs_table(ds)


# ------------------------------------------------------- ngram jaccard ----



class _GramEmit:
    """batch -> (gram, doc_id) rows of per-doc DISTINCT token n-gram hashes."""

    def __init__(self, n: int, mode: str):
        self.n = n
        self.norm = TokenNormalizer(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, vocab = tokenize_batch(batch["text"], self.norm)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vhash = mh.hash_strings(vocab)
        th = vhash[tid] if len(tid) else np.empty(0, np.uint64)
        starts = np.searchsorted(d, np.arange(len(batch)))
        ends = np.searchsorted(d, np.arange(len(batch)), side="right")
        out_gram, out_id = [], []
        for i in range(len(batch)):
            toks = th[starts[i] : ends[i]]
            if len(toks) < self.n:
                continue  # SQL emits no grams for short docs
            grams = np.unique(mh.shingle_hashes(toks, k=self.n))
            out_gram.append(grams.view(np.int64))
            out_id.append(np.full(len(grams), ids[i], dtype=np.int64))
        if not out_gram:
            return pa.table(
                {"gram": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "gram": pa.array(np.concatenate(out_gram)),
                "doc_id": pa.array(np.concatenate(out_id)),
            }
        )


class _NgramBandSign:
    """batch -> LSH band rows over MinHash signatures of token n-grams."""

    def __init__(self, n: int, mode: str):
        self.n = n
        self.norm = TokenNormalizer(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, vocab = tokenize_batch(batch["text"], self.norm)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vhash = mh.hash_strings(vocab)
        th = vhash[tid] if len(tid) else np.empty(0, np.uint64)
        starts = np.searchsorted(d, np.arange(len(batch)))
        ends = np.searchsorted(d, np.arange(len(batch)), side="right")
        bhs = np.empty((len(batch), mh.NUM_BANDS), dtype=np.int64)
        for i in range(len(batch)):
            grams = np.unique(mh.shingle_hashes(th[starts[i]:ends[i]], k=self.n))
            bhs[i] = mh.band_hashes(mh.minhash_signature(grams)).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, mh.NUM_BANDS), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(mh.NUM_BANDS, dtype=np.int32), len(batch))
                ),
                "band_hash": pa.array(bhs.ravel(), pa.int64()),
            }
        )


class _GramSets:
    """batch -> (doc_id, packed gram set) for EVERY doc — the lookup side
    of the blocked tile verify (hash-partitioned; nothing broadcast)."""

    def __init__(self, n: int, mode: str):
        self.n = n
        self.norm = TokenNormalizer(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, vocab = tokenize_batch(batch["text"], self.norm)
        vhash = mh.hash_strings(vocab)
        th = vhash[tid] if len(tid) else np.empty(0, np.uint64)
        starts = np.searchsorted(d, np.arange(len(batch)))
        ends = np.searchsorted(d, np.arange(len(batch)), side="right")
        sets = [
            np.unique(mh.shingle_hashes(th[starts[i]:ends[i]], k=self.n)).tobytes()
            for i in range(len(batch))
        ]
        return pa.table({"doc_id": batch["doc_id"], "grams": pa.array(sets, pa.binary())})


def _run_gather(flat: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Gather variable-length runs flat[starts[i] : starts[i]+lens[i]],
    concatenated — one fancy-index, no Python loop."""
    total = int(lens.sum())
    if total == 0:
        return flat[:0]
    out_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = np.arange(total, dtype=np.int64) + np.repeat(starts - out_starts, lens)
    return flat[idx]


class _PairJaccardVerify:
    """Exact n-gram Jaccard over candidate-pair partitions, fully vectorized.

    The candidate gram sets (one sorted-unique uint64 array per candidate
    doc — blocks shaped like :class:`_GramSets` output, passed as ObjectRefs)
    are assembled ONCE per worker into a flat array + offsets index; each
    pair batch is then: run-gather both sides tagged with the pair index,
    one lexsort, and a bincount of adjacent (pair, gram) duplicates — a
    gram can appear at most once per side, so each duplicate is one
    intersection hit.  No driver dict, no per-pair Python loop (the round-2
    verify held every gram set in a driver dict and looped pairs)."""

    def __init__(self, gram_refs, threshold_pct: int):
        t = pa.concat_tables(ray.get(list(gram_refs)))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        self.ids = ids[order]
        blobs = [t["grams"][int(i)].as_py() for i in order]
        self.sizes = np.array([len(x) // 8 for x in blobs], dtype=np.int64)
        self.flat = np.frombuffer(b"".join(blobs), dtype=np.uint64)
        self.starts = np.concatenate([[0], np.cumsum(self.sizes)[:-1]]).astype(np.int64)
        self.pct = threshold_pct

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(self.ids, a)
        ib = np.searchsorted(self.ids, b)
        la, lb = self.sizes[ia], self.sizes[ib]
        grams = np.concatenate(
            [
                _run_gather(self.flat, self.starts[ia], la),
                _run_gather(self.flat, self.starts[ib], lb),
            ]
        )
        pair_idx = np.concatenate(
            [
                np.repeat(np.arange(len(a), dtype=np.int64), la),
                np.repeat(np.arange(len(b), dtype=np.int64), lb),
            ]
        )
        order = np.lexsort((grams, pair_idx))
        gs, ps = grams[order], pair_idx[order]
        dup = (gs[1:] == gs[:-1]) & (ps[1:] == ps[:-1])
        inter = np.bincount(ps[1:][dup], minlength=len(a)).astype(np.int64)
        union = la + lb - inter
        keep = (union > 0) & (100 * inter >= self.pct * union)
        jac = (100 * inter[keep]) // union[keep]
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "jaccard_pct": pa.array(jac, pa.int64()),
            }
        )


def ngram_jaccard_dedup(
    sf_dir: str, n: int = 3, threshold_pct: int = 80, mode: str = "simple"
) -> pa.Table:
    """EXACT token-n-gram Jaccard >= threshold pairs: (a, b, jaccard_pct).

    The oracle-checkable baseline: per-doc distinct n-gram hashes ->
    groupby(gram) pair generation -> groupby(pair) intersection counts ->
    integer-arithmetic threshold (100*inter >= pct*union, so no float
    boundary cases).  Work is quadratic in the hottest gram's doc count —
    exactly the SQL self-join semantics; ``ngram_jaccard_lsh`` is the
    sub-quadratic banded scale path.
    """

    from ..util import bounded_pair_dataset

    grams = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(stage_fn(_GramEmit, n, mode), batch_format="pyarrow", batch_size=256)
        .materialize()  # consumed twice (pairs + sizes); bounded by distinct (doc, gram)
    )
    # bounded per-gram pair emit (tile descriptors, small-batch expansion
    # — a hot gram never materializes O(g^2) rows in one group call);
    # each gram emits a shared pair exactly once, so the downstream
    # pair-count shuffle still counts |A intersect B|
    return jaccard_pairs_from_grams(
        grams, bounded_pair_dataset(grams, ["gram"]), threshold_pct
    )


def jaccard_pairs_from_grams(
    grams, pair_ds, threshold_pct: int
) -> pa.Table:
    """Shared tail of the exact gram-Jaccard joins: ``pair_ds`` is the
    per-gram candidate pair DATASET (``util.bounded_pair_dataset`` —
    triu for within-corpus, train x eval via ``side_fn`` for
    cross-split; one row per (gram, pair) so the pair-count shuffle
    counts shared grams) -> integer threshold.  Per-doc distinct-gram
    sizes are fetched only for ids that actually appear in a candidate
    pair (filtered BEFORE the driver collect), so the driver state is
    bounded by the candidate-pair footprint, never the corpus."""
    t = pair_ds.groupby(["a", "b"]).count().to_pandas()
    if len(t) == 0:
        return _empty_jaccard_table()
    a = t["a"].to_numpy()
    b = t["b"].to_numpy()
    need = np.unique(np.concatenate([a, b]))
    need_ref = ray.put(need)

    def size_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, ray.get(need_ref))))

    sizes_t = (
        grams.groupby("doc_id")
        .count()
        .map_batches(size_filter, batch_format="pyarrow")
        .to_pandas()
    )
    sz = dict(zip(sizes_t["doc_id"], sizes_t["count()"]))
    inter = t["count()"].to_numpy().astype(np.int64)
    union = (
        np.array([sz[x] for x in a], dtype=np.int64)
        + np.array([sz[x] for x in b], dtype=np.int64)
        - inter
    )
    keep = 100 * inter >= threshold_pct * union
    jac = (100 * inter[keep]) // union[keep]
    order = np.lexsort((b[keep], a[keep]))
    return pa.table(
        {
            "a": pa.array(a[keep][order], pa.int64()),
            "b": pa.array(b[keep][order], pa.int64()),
            "jaccard_pct": pa.array(jac[order], pa.int64()),
        }
    )


def _empty_jaccard_table() -> pa.Table:
    return pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard_pct": pa.array([], pa.int64()),
        }
    )


def ngram_jaccard_lsh(
    sf_dir: str, n: int = 3, threshold: float = 0.8, mode: str = "simple"
) -> pa.Table:
    """Banded-LSH approximate n-gram Jaccard pairs (a, b, jaccard_pct).

    Three stages, none of which moves gram sets through the shuffle (round
    1 shipped every doc's full gram set x NUM_BANDS through the groupby —
    ~8x the tokenized corpus at scale):

    1. sign: (doc_id, band, band_hash) only — 8 fixed-width rows per doc.
    2. candidates: groupby(band, band_hash) -> unique id pairs (vectorized
       triu per bucket; a bucket is a hash collision class, so its size is
       the skew bound, tiled like the minhash verify).
    3. blocked tile verify (the repo-wide pattern, ``linkage``'s
       ``_verify_jaccard_tiles``): gram sets hash-partition once as
       ObjectRefs, the candidate pair stream shuffles ONCE on its
       (partition-of-a, of-b) tile key with in-bucket global dedup, and
       each task pulls only its two gram-set partitions — no candidate
       ids or pairs ever fold to the driver, and exact Jaccard with the
       same integer threshold as :func:`ngram_jaccard_dedup` makes every
       emitted pair exact (precision 1; recall measured in tests and
       pinned as a containment invariant by ``ngram_lsh_consistency``).
    """

    import functools

    from ..util import (
        VERIFY_PARTS,
        bounded_pair_dataset,
        hash_groupby,
        hash_partition_refs,
        tag_pair_tiles,
    )
    from .linkage import _verify_jaccard_tiles

    # bounded per-band-bucket pair emit (util tile machinery): a hot
    # bucket never materializes O(g^2) rows in one group call
    cand = bounded_pair_dataset(
        docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
            stage_fn(_NgramBandSign, n, mode),
            batch_format="pyarrow",
            batch_size=256,
        ),
        ["band", "band_hash"],
    )

    # stage 3: blocked tile verify — gram sets for all docs partitioned
    # once; the pair stream shuffles once on its tile key
    sets_ds = docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_GramSets, n, mode), batch_format="pyarrow", batch_size=256
    ).materialize()
    parts_refs = hash_partition_refs(sets_ds, ["doc_id"], VERIFY_PARTS)
    pct = int(round(threshold * 100))
    out = hash_groupby(
        cand.map_batches(
            functools.partial(tag_pair_tiles, n_parts=VERIFY_PARTS),
            batch_format="pyarrow",
        ),
        keys=["pb_a", "pb_b"],
        finalize=functools.partial(
            _verify_jaccard_tiles, parts_refs=parts_refs, threshold_pct=pct
        ),
        num_partitions=64,
    )
    return pairs_table(out, extra_cols=("jaccard_pct",))


def ngram_lsh_consistency(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Containment invariant: every LSH-found pair must be an exact
    n-gram-Jaccard pair with the identical jaccard_pct (the LSH verify IS
    the exact computation, restricted to candidates).  Returns one row
    (n_exact_pairs, n_lsh_false_pairs); the oracle recomputes the exact
    pair count in SQL and pins false pairs at 0."""
    exact = ngram_jaccard_dedup(sf_dir, mode=mode)
    lsh = ngram_jaccard_lsh(sf_dir, mode=mode)
    ex = set(
        zip(
            exact["a"].to_pylist(),
            exact["b"].to_pylist(),
            exact["jaccard_pct"].to_pylist(),
        )
    )
    got = set(
        zip(lsh["a"].to_pylist(), lsh["b"].to_pylist(), lsh["jaccard_pct"].to_pylist())
    )
    return pa.table(
        {
            "n_exact_pairs": pa.array([len(ex)], pa.int64()),
            "n_lsh_false_pairs": pa.array([len(got - ex)], pa.int64()),
        }
    )


# --------------------------------------------- span-level (substring) dedup ----
#
# Doc-level dedup (everything above) keeps or drops whole documents; web-scale
# training corpora also need SPAN-level dedup — boilerplate headers, license
# blocks and templated paragraphs recur verbatim inside otherwise-unique
# documents (Lee et al., "Deduplicating Training Data Makes Language Models
# Better", ACL 2022, builds a suffix array to find them).  A suffix array
# doesn't distribute; the Ray-Data-native equivalent is a fixed-k token
# n-gram pass: a k-gram occurring in >= min_df distinct documents marks a
# duplicated span.  Two bucket shuffles, no broadcast, no driver residency:
#
#     tokenize -> (gram, doc_id, n_occ) per-doc occurrence rows
#     -> hash_groupby(gram): df per gram, tag each row hot = df >= min_df
#     -> hash_groupby(doc_id): per-doc totals (repeated_ngrams)
#        / per-bucket top-N + tiny driver merge (hot_ngrams)
#
# Gram keys are the joined token STRINGS, which keeps the op exact (and
# value-comparable to the SQL oracle) at any corpus size; at petabyte scale
# the same pipeline runs with a 128-bit hash of the string as the shuffle
# key — the shape is unchanged, only the key narrows.


class _GramOccStage:
    """batch -> (gram, doc_id, n_occ): per-doc k-gram occurrence counts.

    Fully vectorized: grams are built with k-1 elementwise concatenations
    over the flat token stream; spans crossing a document boundary are
    masked out; per-(doc, gram) counts come from one pandas groupby.
    """

    def __init__(self, k: int, mode: str):
        self.k = k
        self.norm = TokenNormalizer(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "n_occ": pa.array([], pa.int64()),
            }
        )
        d, tid, vocab = tokenize_batch(batch["text"], self.norm)
        k = self.k
        if len(tid) < k:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = np.asarray(vocab, dtype=object)[tid]
        n = len(toks) - k + 1
        gram = toks[:n]
        for j in range(1, k):
            gram = gram + " "
            gram = gram + toks[j : j + n]
        valid = d[:n] == d[k - 1 :]  # gram must not straddle documents
        if not valid.any():
            return empty
        grp = (
            pd.DataFrame({"doc": d[:n][valid], "gram": gram[valid]})
            .groupby(["doc", "gram"], sort=False)
            .size()
        )
        idx = grp.index
        return pa.table(
            {
                "gram": pa.array(idx.get_level_values(1), pa.string()),
                "doc_id": pa.array(ids[idx.get_level_values(0)], pa.int64()),
                "n_occ": pa.array(grp.to_numpy().astype(np.int64)),
            }
        )


def _gram_occ_ds(sf_dir: str, k: int, mode: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, columns=["doc_id", "text"]).map_batches(
        stage_fn(_GramOccStage, k, mode), batch_format="pyarrow", batch_size=512
    )


def repeated_ngrams(
    sf_dir: str, k: int = 4, min_df: int = 2, mode: str = "simple"
) -> ray.data.Dataset:
    """Per-document duplicated-span stats: (doc_id, n_grams, n_rep_occ,
    n_rep_grams) where a k-gram is "repeated" if it occurs in >= min_df
    distinct documents.  n_grams counts all k-gram positions, n_rep_occ the
    positions covered by repeated grams (the curation signal: high
    n_rep_occ / n_grams = boilerplate-heavy document), n_rep_grams the
    distinct repeated grams.  Documents shorter than k tokens emit no row
    (they have no spans to deduplicate) — the SQL oracle matches.
    """
    from ..util import hash_groupby

    def attach_df(t: pa.Table) -> pa.Table:
        # the bucket holds EVERY (doc, gram) row of its grams -> df is exact
        import pandas as pd

        codes, _ = pd.factorize(t["gram"].to_numpy(zero_copy_only=False))
        df_per_gram = np.bincount(codes)
        hot = (df_per_gram[codes] >= min_df).astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "n_occ": t["n_occ"], "hot": pa.array(hot)}
        )

    def doc_fold(t: pa.Table) -> pa.Table:
        n_occ = t["n_occ"].to_numpy(zero_copy_only=False)
        hot = t["hot"].to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_occ": t["n_occ"],
                    "rep_occ": pa.array(n_occ * hot),
                    "hot": t["hot"],
                }
            )
            .group_by(["doc_id"], use_threads=False)
            .aggregate([("n_occ", "sum"), ("rep_occ", "sum"), ("hot", "sum")])
        )
        return g.rename_columns(["doc_id", "n_grams", "n_rep_occ", "n_rep_grams"])

    per_gram = hash_groupby(_gram_occ_ds(sf_dir, k, mode), ["gram"], attach_df)
    return hash_groupby(per_gram, ["doc_id"], doc_fold)


def hot_ngrams(
    sf_dir: str, k: int = 4, min_df: int = 2, top: int = 100, mode: str = "simple"
) -> pa.Table:
    """Corpus-wide boilerplate detector: the `top` k-grams by document
    frequency (ties: total occurrences desc, then gram asc) among grams
    seen in >= min_df distinct documents.  Per-bucket top-N inside the
    gram shuffle, then a <= top x n_buckets driver merge — the global sort
    never touches more than n_buckets * top rows."""

    def bucket_top(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = (
            t.group_by(["gram"], use_threads=False)
            .aggregate([("doc_id", "count"), ("n_occ", "sum")])
            .rename_columns(["gram", "df", "total_occ"])
        )
        g = g.filter(pc.greater_equal(g["df"], min_df))
        df = g.to_pandas().sort_values(
            ["df", "total_occ", "gram"], ascending=[False, False, True]
        )
        return pa.Table.from_pandas(df.head(top), preserve_index=False)

    from ..util import hash_groupby

    merged = hash_groupby(
        _gram_occ_ds(sf_dir, k, mode), ["gram"], bucket_top
    ).to_pandas()
    merged = merged.sort_values(
        ["df", "total_occ", "gram"], ascending=[False, False, True]
    ).head(top)
    out = pa.Table.from_pandas(merged.reset_index(drop=True), preserve_index=False)
    return pa.table(
        {
            "gram": out["gram"].cast(pa.string()),
            "df": out["df"].cast(pa.int64()),
            "total_occ": out["total_occ"].cast(pa.int64()),
        }
    )


def _gram_cte(k: int) -> str:
    """Shared CTE: (doc_id, gram, n_occ) per-doc k-gram occurrence counts,
    mirroring ``_GramOccStage`` over ``mode='simple'`` tokens."""
    concat = " || ' ' || ".join(f"a[i+{j}]" if j else "a[i]" for j in range(k))
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS a
          FROM documents
        ),
        pos AS (
          SELECT doc_id, a, unnest(range(1, len(a) - {k - 2})) AS i
          FROM arr WHERE len(a) >= {k}
        ),
        g AS (SELECT doc_id, {concat} AS gram FROM pos),
        occ AS (SELECT doc_id, gram, count(*) AS n_occ FROM g GROUP BY doc_id, gram),
        dfreq AS (SELECT gram, count(*) AS df, sum(n_occ) AS total_occ
                  FROM occ GROUP BY gram)
    """


def repeated_ngrams_sql_oracle(k: int = 4, min_df: int = 2) -> str:
    return f"""
        {_gram_cte(k)}
        SELECT o.doc_id,
               CAST(sum(o.n_occ) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN d.df >= {min_df} THEN o.n_occ ELSE 0 END)
                    AS BIGINT) AS n_rep_occ,
               CAST(sum(CASE WHEN d.df >= {min_df} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rep_grams
        FROM occ o JOIN dfreq d USING (gram)
        GROUP BY o.doc_id
    """


def hot_ngrams_sql_oracle(k: int = 4, min_df: int = 2, top: int = 100) -> str:
    return f"""
        {_gram_cte(k)}
        SELECT gram, CAST(df AS BIGINT) AS df,
               CAST(total_occ AS BIGINT) AS total_occ
        FROM dfreq WHERE df >= {min_df}
        ORDER BY df DESC, total_occ DESC, gram ASC
        LIMIT {top}
    """


# -------------------------------------------------- canonical selection ----


class _TokCountFor:
    """batch -> (doc_id, n_tokens) for broadcast candidate ids only."""

    def __init__(self, mode: str, cand_ids_ref):
        self.norm = TokenNormalizer(mode)
        self.want = ray.get(cand_ids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, self.want)
        if not mask.any():
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        sub = batch.filter(pa.array(mask))
        d, _, _ = tokenize_batch(sub["text"], self.norm)
        n = np.bincount(d, minlength=len(sub)).astype(np.int64)
        return pa.table({"doc_id": sub["doc_id"], "n_tokens": pa.array(n)})


def dedup_canonical(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Near-dup supersede rule: which documents should a curation pass DROP,
    and which neighbor supersedes each.

    (doc_id, kept_by, n_tokens), one row per document that has at least one
    simhash neighbor (Hamming <= SIMHASH_MAX_HAMMING, the ``simhash_dedup``
    relation) strictly dominating it on (n_tokens DESC, doc_id ASC);
    ``kept_by`` is the top such dominator under the same order — the
    retention policy real pipelines apply after near-dup detection (keep
    the longest copy, oldest id breaking ties).  Chains are possible
    (kept_by may itself be dropped toward a better copy) — transitive
    cluster canonicalization is ``minhash_clusters``' union-find job; this
    is the exact per-neighbor rule, which makes it fully SQL-checkable.

    Scale shape: the pair set is the banded-LSH output (only near-dups,
    never the corpus); token counts are refetched for pair members only via
    a broadcast-id filtered streaming read (the ``_GramSets`` shape, filtered);
    the dominance fold is vectorized over the pair table.
    """
    pairs = simhash_dedup(sf_dir, mode)
    if pairs.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "kept_by": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    ids = np.unique(np.concatenate([a, b]))
    counts = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_TokCountFor, mode, ray.put(ids)),
            batch_format="pyarrow",
            batch_size=256,
        )
        .to_pandas()
    )
    cid = counts["doc_id"].to_numpy()
    cn = counts["n_tokens"].to_numpy()
    order = np.argsort(cid)
    ntok = cn[order][np.searchsorted(cid[order], ids)]

    # directed edges (x <- y): y dominates x on (n_tokens DESC, doc_id ASC)
    x = np.concatenate([a, b])
    y = np.concatenate([b, a])
    nx = ntok[np.searchsorted(ids, x)]
    ny = ntok[np.searchsorted(ids, y)]
    dom = (ny > nx) | ((ny == nx) & (y < x))
    x, y, nx, ny = x[dom], y[dom], nx[dom], ny[dom]
    if len(x) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "kept_by": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    # per dropped doc: best dominator = first under (x ASC, ny DESC, y ASC)
    o = np.lexsort((y, -ny, x))
    x, y, nx = x[o], y[o], nx[o]
    first = np.concatenate([[True], x[1:] != x[:-1]])
    return pa.table(
        {
            "doc_id": pa.array(x[first], pa.int64()),
            "kept_by": pa.array(y[first], pa.int64()),
            "n_tokens": pa.array(nx[first], pa.int64()),
        }
    )


# -------------------------------------------------------------- line dedup ----

_LINE_ORD_CAP = 1 << 22  # lines-per-document bound for the packed (doc, ord) key


class _LineExplode:
    """batch -> (line, doc_id, ord, line_chars): vectorized Arrow line split.

    ``pc.split_pattern`` is the Arrow kernel (no Python per-row loop);
    ordinals are 1-based within the document, derived from the list
    offsets — identical to SQL's zipped ``unnest(string_split(...))`` /
    ``unnest(range(...))`` semantics (empty text yields one empty line).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lines = pc.split_pattern(text, pattern="\n")
        n = pc.list_value_length(lines).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lines)
        if len(n) and int(n.max()) >= _LINE_ORD_CAP:
            raise ValueError(
                f"document with >= {_LINE_ORD_CAP} lines breaks the packed "
                "(doc_id, ord) first-occurrence key; raise _LINE_ORD_CAP"
            )
        doc = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), n)
        starts = np.cumsum(n) - n
        ords = np.arange(len(doc), dtype=np.int64) - np.repeat(starts, n) + 1
        return pa.table(
            {
                "line": flat,
                "doc_id": pa.array(doc, pa.int64()),
                "ord": pa.array(ords, pa.int64()),
                "line_chars": pc.utf8_length(flat).cast(pa.int64()),
            }
        )


def _line_first_partials(t: pa.Table) -> pa.Table:
    """bucket (holding EVERY row of its lines) -> per-doc partial counts.

    keep = this (doc_id, ord) is the corpus-global first occurrence of the
    line (min packed key).  Rows collapse to one partial row per document
    per bucket before the second (narrow, integer-only) shuffle.
    """
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_lines_part": pa.array([], pa.int64()),
            "n_kept_part": pa.array([], pa.int64()),
            "kept_chars_part": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    import pandas as pd

    codes, _ = pd.factorize(t["line"].to_numpy(zero_copy_only=False))
    doc = t["doc_id"].to_numpy()
    key = doc * _LINE_ORD_CAP + t["ord"].to_numpy()
    first = np.full(codes.max() + 1, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first, codes, key)
    keep = (key == first[codes]).astype(np.int64)
    chars = t["line_chars"].to_numpy()
    udoc, dinv = np.unique(doc, return_inverse=True)
    return pa.table(
        {
            "doc_id": pa.array(udoc, pa.int64()),
            "n_lines_part": pa.array(np.bincount(dinv), pa.int64()),
            "n_kept_part": pa.array(
                np.bincount(dinv, weights=keep).astype(np.int64), pa.int64()
            ),
            "kept_chars_part": pa.array(
                np.bincount(dinv, weights=chars * keep).astype(np.int64),
                pa.int64(),
            ),
        }
    )


def line_dedup(sf_dir: str) -> ray.data.Dataset:
    """Corpus-global duplicate-LINE removal stats (the RefinedWeb / CCNet
    line-dedup pass): each exact line is kept only at its first occurrence
    under (doc_id, ord) order; every later copy — boilerplate headers,
    license banners, repeated code lines — is dropped.

    (doc_id, n_lines, n_kept, kept_chars), one row per document, sorted by
    doc_id.  Two shuffles: the line shuffle carries each line's text across
    the object store exactly once (unavoidable for exact line identity —
    the task-based bucket shuffle hash-partitions on the line so a bucket
    holds every copy); the second pass moves only 4 int64 columns of
    per-(doc, bucket) partials.  At 10^12-doc scale both are
    hash-partitioned exchanges with no driver-side state.
    """
    from ray.data.aggregate import Sum

    from ..util import hash_groupby

    exploded = docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_LineExplode), batch_format="pyarrow", batch_size=256
    )
    partials = hash_groupby(exploded, ["line"], _line_first_partials)
    return (
        partials.groupby("doc_id")
        .aggregate(
            Sum("n_lines_part", alias_name="n_lines"),
            Sum("n_kept_part", alias_name="n_kept"),
            Sum("kept_chars_part", alias_name="kept_chars"),
        )
        .sort("doc_id")
    )


# ----------------------------------------------- duplicated-span coverage ----


class _GramPosStage:
    """batch -> (gram, doc_id, pos): every k-gram POSITION (1-based within
    the document) — the positional variant of ``_GramOccStage`` that span
    coverage needs (overlapping duplicated grams must not double-count
    covered tokens, so the reduce side has to see positions, not counts)."""

    def __init__(self, k: int, mode: str):
        self.k = k
        self.norm = TokenNormalizer(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
        d, tid, vocab = tokenize_batch(batch["text"], self.norm)
        k = self.k
        if len(tid) < k:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = np.asarray(vocab, dtype=object)[tid]
        n = len(toks) - k + 1
        gram = toks[:n]
        for j in range(1, k):
            gram = gram + " "
            gram = gram + toks[j : j + n]
        valid = d[:n] == d[k - 1 :]  # gram must not straddle documents
        if not valid.any():
            return empty
        # 1-based position within the token stream of its own document
        changes = np.concatenate([[0], np.flatnonzero(d[1:] != d[:-1]) + 1])
        runlens = np.diff(np.concatenate([changes, [len(d)]]))
        pos = np.arange(len(d), dtype=np.int64) - np.repeat(changes, runlens) + 1
        dv = d[:n][valid]
        return pa.table(
            {
                "gram": pa.array(gram[valid], pa.string()),
                "doc_id": pa.array(ids[dv], pa.int64()),
                "pos": pa.array(pos[:n][valid], pa.int64()),
            }
        )


def dup_span_coverage(
    sf_dir: str, k: int = 4, min_df: int = 2, mode: str = "simple"
) -> ray.data.Dataset:
    """Exact duplicated-substring coverage per document (the Lee et al.
    "Deduplicating Training Data" span metric): a token position is
    COVERED when it lies inside at least one k-gram that occurs in >=
    min_df distinct documents; overlapping duplicated grams count each
    token once.

    (doc_id, n_hot_pos, covered_pos), one row per document owning at
    least one duplicated gram: n_hot_pos = duplicated k-gram start
    positions, covered_pos = tokens under the union of their [pos,
    pos+k-1] spans — the number a span-cut curation pass would remove.

    Shape: gram-keyed bucket shuffle (positions ride along; volume =
    token count, the same order as every tokenize shuffle here) -> bucket
    computes exact distinct-doc df and keeps only duplicated positions ->
    doc-keyed shuffle unions intervals vectorized (sorted-diff, no Python
    loop).  Only duplicated positions cross the second shuffle.
    """
    from ..util import hash_groupby

    def cover_fold(t: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_hot_pos": pa.array([], pa.int64()),
                "covered_pos": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        doc = t["doc_id"].to_numpy()
        pos = t["pos"].to_numpy()
        order = np.lexsort((pos, doc))
        d2, p2 = doc[order], pos[order]
        same_next = np.concatenate([d2[1:] == d2[:-1], [False]])
        gap = np.empty(len(p2), dtype=np.int64)
        if len(p2) > 1:
            gap[:-1] = p2[1:] - p2[:-1]
        gap[-1] = k
        contrib = np.where(same_next, np.minimum(gap, k), k)
        codes, udoc = pd.factorize(d2)
        return pa.table(
            {
                "doc_id": pa.array(udoc, pa.int64()),
                "n_hot_pos": pa.array(np.bincount(codes), pa.int64()),
                "covered_pos": pa.array(
                    np.bincount(codes, weights=contrib).astype(np.int64), pa.int64()
                ),
            }
        )

    grams = docs_dataset(sf_dir, columns=["doc_id", "text"]).map_batches(
        stage_fn(_GramPosStage, k, mode), batch_format="pyarrow", batch_size=512
    )
    hot_pos = hash_groupby(grams, ["gram"], _hot_positions_fn(min_df))
    return hash_groupby(hot_pos, ["doc_id"], cover_fold)


def _hot_positions_fn(min_df: int):
    """Bucket kernel (gram-keyed shuffle side, shared by
    ``dup_span_coverage`` and ``strip_dup_spans``): exact distinct-doc df
    per gram inside the bucket, keep only positions of grams with df >=
    min_df — (doc_id, pos) rows out."""

    def attach_hot(t: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        codes, _ = pd.factorize(t["gram"].to_numpy(zero_copy_only=False))
        doc = t["doc_id"].to_numpy()
        order = np.lexsort((doc, codes))
        c2, d2 = codes[order], doc[order]
        newpair = np.concatenate([[True], (c2[1:] != c2[:-1]) | (d2[1:] != d2[:-1])])
        df = np.bincount(c2[newpair], minlength=codes.max() + 1)
        hot = df[codes] >= min_df
        if not hot.any():
            return empty
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(hot)),
                "pos": t["pos"].filter(pa.array(hot)),
            }
        )

    return attach_hot


def dup_span_coverage_sql_oracle(k: int = 4, min_df: int = 2) -> str:
    concat = " || ' ' || ".join(f"a[i+{j}]" if j else "a[i]" for j in range(k))
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS a
          FROM documents
        ),
        pos AS (
          SELECT doc_id, a, unnest(range(1, len(a) - {k - 2})) AS i
          FROM arr WHERE len(a) >= {k}
        ),
        g AS (SELECT doc_id, i, {concat} AS gram FROM pos),
        dfq AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram),
        hotp AS (
          SELECT g.doc_id, g.i FROM g JOIN dfq USING (gram)
          WHERE dfq.df >= {min_df}
        ),
        cov AS (SELECT doc_id, i + unnest(range(0, {k})) AS p FROM hotp),
        c1 AS (SELECT doc_id, count(*) AS n_hot_pos FROM hotp GROUP BY doc_id),
        c2 AS (SELECT doc_id, count(DISTINCT p) AS covered_pos FROM cov GROUP BY doc_id)
        SELECT doc_id, n_hot_pos, covered_pos
        FROM c1 JOIN c2 USING (doc_id) ORDER BY doc_id
    """


# --------------------------------------------------------- soft dedup ----


def dup_weights(sf_dir: str) -> ray.data.Dataset:
    """Soft deduplication: instead of dropping exact duplicates, assign
    every document a training-sampling weight inversely proportional to
    its copy count (the SoftDeDup idea — down-weight, don't delete).

    One row per document: (doc_id, n_copies, weight_ppm) with
    weight_ppm = 1_000_000 // n_copies (integer, so the SQL oracle is
    hash-exact).

    Scale shape: one hash shuffle of (sha256, doc_id) pairs — 40 bytes a
    document — co-locates each content group; group sizes fan back out to
    the member rows inside the bucket with one factorize + bincount.  No
    driver state, no join: the same single-shuffle pattern as
    ``exact_dedup`` but emitting per-document rows instead of per-group.
    """
    import hashlib

    from ..util import hash_groupby

    def add_sha(batch: pa.Table) -> pa.Table:
        sha = [
            hashlib.sha256(s.encode()).hexdigest()
            for s in batch["text"].to_pylist()
        ]
        return pa.table(
            {"content_sha256": pa.array(sha, pa.string()), "doc_id": batch["doc_id"]}
        )

    def per_doc(bucket: pa.Table) -> pa.Table:
        if bucket.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_copies": pa.array([], pa.int64()),
                    "weight_ppm": pa.array([], pa.int64()),
                }
            )
        import pandas as pd

        codes, _ = pd.factorize(bucket["content_sha256"].to_numpy(zero_copy_only=False))
        sizes = np.bincount(codes)
        n = sizes[codes].astype(np.int64)
        return pa.table(
            {
                "doc_id": bucket["doc_id"],
                "n_copies": pa.array(n, pa.int64()),
                "weight_ppm": pa.array(1_000_000 // n, pa.int64()),
            }
        )

    signed = docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pyarrow"
    )
    return hash_groupby(signed, ["content_sha256"], per_doc)


def dup_weights_sql_oracle() -> str:
    return """
        WITH g AS (SELECT sha256(text) AS s, count(*) AS n
                   FROM documents GROUP BY 1)
        SELECT d.doc_id,
               CAST(g.n AS BIGINT) AS n_copies,
               CAST(1000000 // g.n AS BIGINT) AS weight_ppm
        FROM documents d JOIN g ON sha256(d.text) = g.s
    """


# ----------------------------------------------- span-cut transformation ----


class _TokenPosStage:
    """batch -> (doc_id, pos, token, is_hot=0): every token occurrence with
    its 1-based position — the reconstruction stream ``strip_dup_spans``
    unions with the hot-position stream before the doc-keyed shuffle."""

    def __init__(self, mode: str):
        self.norm = TokenNormalizer(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, vocab = tokenize_batch(batch["text"], self.norm)
        if len(d) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "is_hot": pa.array([], pa.int8()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        changes = np.concatenate([[0], np.flatnonzero(d[1:] != d[:-1]) + 1])
        runlens = np.diff(np.concatenate([changes, [len(d)]]))
        pos = np.arange(len(d), dtype=np.int64) - np.repeat(changes, runlens) + 1
        return pa.table(
            {
                "doc_id": pa.array(ids[d], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "token": pa.array(np.asarray(vocab, dtype=object)[tid], pa.string()),
                "is_hot": pa.array(np.zeros(len(d), np.int8)),
            }
        )


def strip_dup_spans(
    sf_dir: str, k: int = 4, min_df: int = 2, mode: str = "simple"
) -> ray.data.Dataset:
    """The Lee et al. span-CUT transformation (the curation pass
    ``dup_span_coverage`` only measures): remove every token lying under a
    k-gram that occurs in >= min_df distinct documents, and emit what
    remains.

    (doc_id, n_tokens, n_kept, kept_sha256), one row per document with >=
    1 token; kept_sha256 = sha256 of the space-joined surviving tokens in
    order ('' when everything was cut) — the hash stands in for the
    rewritten text so the row stays small and the SQL oracle can recompute
    it exactly.

    Shape: the gram-keyed shuffle + exact-df hot filter is shared verbatim
    with ``dup_span_coverage`` (``_hot_positions_fn``); the rebuild unions
    the token stream with the (much smaller) hot-start stream and makes
    ONE doc-keyed shuffle — interval coverage is a clipped +-1 diff array
    over the bucket's concatenated token runs (one cumsum, no Python loop;
    the per-doc join for the hash is the only row loop, bounded by the
    bucket's documents)."""
    from ..util import hash_groupby

    def rebuild(t: pa.Table) -> pa.Table:
        import hashlib

        import pandas as pd

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "kept_sha256": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0:
            return empty
        is_hot = t["is_hot"].to_numpy(zero_copy_only=False).astype(bool)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        tdoc, tpos = doc[~is_hot], pos[~is_hot]
        toks = t["token"].to_numpy(zero_copy_only=False)[~is_hot]
        if len(tdoc) == 0:
            return empty
        codes, udoc = pd.factorize(tdoc)
        order = np.lexsort((tpos, codes))
        codes_s, toks_s = codes[order], toks[order]
        n_per = np.bincount(codes, minlength=len(udoc))
        base = np.concatenate([[0], np.cumsum(n_per)])
        total = int(base[-1])
        diff = np.zeros(total + 1, np.int64)
        hdoc, hpos = doc[is_hot], pos[is_hot]
        if len(hdoc):
            srt = np.argsort(udoc)
            hcodes = srt[np.searchsorted(udoc, hdoc, sorter=srt)]
            g_start = base[hcodes] + (hpos - 1)
            g_end = base[hcodes] + np.minimum(hpos - 1 + k, n_per[hcodes])
            np.add.at(diff, g_start, 1)
            np.add.at(diff, g_end, -1)
        covered = np.cumsum(diff[:total]) > 0
        keep = ~covered
        shas, n_kept = [], np.zeros(len(udoc), np.int64)
        for ci in range(len(udoc)):
            sl = slice(base[ci], base[ci + 1])
            kept = toks_s[sl][keep[sl]]
            n_kept[ci] = len(kept)
            shas.append(
                hashlib.sha256(" ".join(kept).encode()).hexdigest()
                if len(kept)
                else ""
            )
        return pa.table(
            {
                "doc_id": pa.array(udoc, pa.int64()),
                "n_tokens": pa.array(n_per, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "kept_sha256": pa.array(shas, pa.string()),
            }
        )

    grams = docs_dataset(sf_dir, columns=["doc_id", "text"]).map_batches(
        stage_fn(_GramPosStage, k, mode), batch_format="pyarrow", batch_size=512
    )

    def hot_as_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": t["pos"],
                "token": pa.array([""] * t.num_rows, pa.string()),
                "is_hot": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    hot = hash_groupby(grams, ["gram"], _hot_positions_fn(min_df)).map_batches(
        hot_as_rows, batch_format="pyarrow"
    )
    tokens = docs_dataset(sf_dir, columns=["doc_id", "text"]).map_batches(
        stage_fn(_TokenPosStage, mode), batch_format="pyarrow", batch_size=512
    )
    return hash_groupby(tokens.union(hot), ["doc_id"], rebuild)


def strip_dup_spans_sql_oracle(k: int = 4, min_df: int = 2) -> str:
    concat = " || ' ' || ".join(f"a[i+{j}]" if j else "a[i]" for j in range(k))
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS a
          FROM documents
        ),
        tok AS (
          SELECT doc_id, u.i AS pos, a[u.i] AS token, len(a) AS n
          FROM arr, unnest(range(1, len(a) + 1)) u(i)
        ),
        pos AS (
          SELECT doc_id, a, unnest(range(1, len(a) - {k - 2})) AS i
          FROM arr WHERE len(a) >= {k}
        ),
        g AS (SELECT doc_id, i, {concat} AS gram FROM pos),
        dfq AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram),
        hotp AS (
          SELECT g.doc_id, g.i FROM g JOIN dfq USING (gram)
          WHERE dfq.df >= {min_df}
        ),
        cov AS (SELECT DISTINCT doc_id, i + unnest(range(0, {k})) AS p FROM hotp),
        kept AS (
          SELECT t.doc_id, t.pos, t.token
          FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
          WHERE c.p IS NULL
        ),
        agg AS (
          SELECT doc_id, count(*) AS n_kept,
                 sha256(string_agg(token, ' ' ORDER BY pos)) AS kept_sha256
          FROM kept GROUP BY doc_id
        ),
        nn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
               FROM tok GROUP BY doc_id)
        SELECT nn.doc_id, nn.n_tokens,
               CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
               coalesce(agg.kept_sha256, '') AS kept_sha256
        FROM nn LEFT JOIN agg USING (doc_id)
    """


# ------------------------------------------- persisted MinHash LSH index ----


def build_minhash_index(sf_dir: str, out_dir: str, mode: str = "simple") -> str:
    """Persist the banded MinHash signature table as a probeable dedup
    index: hive-partitioned parquet ``bands/band=K/`` (one partition per
    LSH band) holding (doc_id, band_hash, sig) rows, plus an
    ``mstats.json`` fingerprint manifest (resumable — a matching build is
    skipped).

    The partitioned layout IS the index: deduplicating a NEW ingest batch
    against the existing corpus (``probe_minhash_index``) reads only the
    band partitions, filtered by the batch's own band hashes — the corpus
    signatures never recompute and never fully load.  This is the
    incremental counterpart of the one-shot ``minhash_dedup`` (reference
    D1/D2 register-then-lookup lifecycle, ``shingles/shingle.h``)."""
    import glob as _glob
    import json
    import shutil

    man_path = os.path.join(out_dir, "mstats.json")
    # fingerprint covers the source files' identity AND content state
    # (size+mtime), so regenerated data at the same path rebuilds
    src_files = sorted(
        _glob.glob(os.path.join(sf_dir, "documents.*"))
    ) or [sf_dir]
    sig_parts = [
        f"{os.path.abspath(p)}:{os.path.getsize(p)}:{int(os.path.getmtime(p))}"
        for p in src_files
        if os.path.exists(p)
    ]
    fp = f"{mode}|" + "|".join(sig_parts)
    if os.path.exists(man_path):
        with open(man_path) as f:
            if json.load(f).get("fingerprint") == fp:
                return out_dir
    bands_dir = os.path.join(out_dir, "bands")
    # a stale or mismatched index must not leave old parquet behind —
    # Ray's write_parquet appends uuid-named files into existing dirs
    shutil.rmtree(bands_dir, ignore_errors=True)
    if os.path.exists(man_path):
        os.remove(man_path)
    sign = docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_SignStage, mode), batch_format="pyarrow", batch_size=256
    )
    os.makedirs(out_dir, exist_ok=True)
    sign.write_parquet(bands_dir, partition_cols=["band"])
    tmp = man_path + f".{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump({"fingerprint": fp, "num_bands": mh.NUM_BANDS}, f)
    os.replace(tmp, man_path)
    return out_dir


class _ProbeMinhash:
    """Sign-and-probe stage: new-document batch -> verified (a=new_id,
    b=old_id) near-dup pairs against a persisted MinHash index.

    Signing and probing fuse in one map (no shuffle); per batch and band
    the index is read ONCE with a (band partition, band_hash isin) filter
    — predicate pushdown keeps unprobed partitions in storage."""

    def __init__(self, index_dir: str, mode: str = "simple", fp: str = ""):
        # ``fp`` (the index fingerprint) is part of stage_fn's cache key:
        # a rebuilt index gets fresh per-worker dataset handles instead of
        # a stale cached file listing
        import pyarrow.dataset as pads

        self.norm = TokenNormalizer(mode)
        self.text_col = "text"  # _SignStage.__call__ reads norm/text_col
        self.dset = pads.dataset(
            os.path.join(index_dir, "bands"), partitioning="hive"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
        sign = _SignStage.__call__(self, batch)  # shares norm/text_col attrs
        if sign.num_rows == 0:
            return empty
        nb = sign["band"].to_numpy(zero_copy_only=False)
        nh = sign["band_hash"].to_numpy(zero_copy_only=False)
        nid = sign["doc_id"].to_numpy(zero_copy_only=False)
        nsig = np.frombuffer(
            b"".join(sign["sig"].to_pylist()), dtype=np.uint8
        ).reshape(sign.num_rows, mh.NUM_HASHES)
        a_parts, b_parts = [], []
        for band in np.unique(nb):
            sel = nb == band
            hset = np.unique(nh[sel])
            old = self.dset.to_table(
                columns=["doc_id", "band_hash", "sig"],
                filter=(pads.field("band") == int(band))
                & pads.field("band_hash").isin(hset.tolist()),
            )
            if old.num_rows == 0:
                continue
            oid = old["doc_id"].to_numpy(zero_copy_only=False)
            oh = old["band_hash"].to_numpy(zero_copy_only=False)
            osig = np.frombuffer(
                b"".join(old["sig"].to_pylist()), dtype=np.uint8
            ).reshape(old.num_rows, mh.NUM_HASHES)
            oorder = np.argsort(oh, kind="stable")
            oh, oid, osig = oh[oorder], oid[oorder], osig[oorder]
            for h in hset:
                nsel = np.flatnonzero(sel & (nh == h))
                lo, hi = np.searchsorted(oh, h), np.searchsorted(oh, h, side="right")
                if len(nsel) == 0 or hi == lo:
                    continue
                eq = (nsig[nsel][:, None, :] == osig[lo:hi][None, :, :]).sum(axis=2)
                ii, jj = np.where(eq >= mh.SIM_THRESHOLD_BYTES)
                if len(ii) == 0:
                    continue
                na, ob = nid[nsel][ii], oid[lo:hi][jj]
                keep = na != ob
                a_parts.append(na[keep])
                b_parts.append(ob[keep])
        if not a_parts:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_parts), pa.int64()),
                "b": pa.array(np.concatenate(b_parts), pa.int64()),
            }
        )


def probe_minhash_index(
    index_dir: str, new_docs: ray.data.Dataset, mode: str = "simple"
) -> pa.Table:
    """Near-dup pairs (a = new doc, b = indexed doc) for an ingest batch
    probed against a ``build_minhash_index`` artifact; unique, sorted."""
    import json

    with open(os.path.join(index_dir, "mstats.json")) as f:
        fp = json.load(f).get("fingerprint", "")
    ds = new_docs.map_batches(
        stage_fn(_ProbeMinhash, index_dir, mode, fp),
        batch_format="pyarrow",
        batch_size=256,
    )
    return pairs_table(ds)


def minhash_probe_consistency(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Probe-path invariants, self-probing the corpus against its own
    persisted index: (1) every exact-duplicate pair (sha-equal, distinct
    doc_id) is found in BOTH probe directions — identical text means
    identical signatures, so every band collides and the byte similarity
    is 64/64; (2) every reported pair re-verifies at >= 57/64 bytes on
    from-scratch signatures.  One row (exact_dups_found, pairs_verified);
    the oracle pins the constants, pytest plants the near-dup cases."""
    import hashlib

    from .text import docs_dataset as _dd

    key = hashlib.sha1(f"{os.path.abspath(sf_dir)}:{mode}".encode()).hexdigest()[:12]
    idx = f"/tmp/index_ray_mhidx_{key}"
    build_minhash_index(sf_dir, idx, mode)
    pairs = probe_minhash_index(idx, _dd(sf_dir, ["doc_id", "text"]), mode)
    got = set(zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()))

    from .text import sha256_map

    sm = sha256_map(sf_dir).to_pandas()
    by_sha: dict[str, list[int]] = {}
    for did, sha in zip(sm["doc_id"], sm["content_sha256"]):
        by_sha.setdefault(sha, []).append(int(did))
    exact_ok = 1
    for members in by_sha.values():
        for x in members:
            for y in members:
                if x != y and (x, y) not in got:
                    exact_ok = 0

    # re-verify every reported pair on fresh signatures
    docs = _dd(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_SignStage, mode), batch_format="pyarrow", batch_size=256
    ).to_pandas()
    docs = docs[docs["band"] == 0]
    sig_by_id = {
        int(d): np.frombuffer(s, dtype=np.uint8)
        for d, s in zip(docs["doc_id"], docs["sig"])
    }
    verified = 1
    for x, y in got:
        if (sig_by_id[x] == sig_by_id[y]).sum() < mh.SIM_THRESHOLD_BYTES:
            verified = 0
    return pa.table(
        {
            "exact_dups_found": pa.array([exact_ok], pa.int64()),
            "pairs_verified": pa.array([verified], pa.int64()),
        }
    )
