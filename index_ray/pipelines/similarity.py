"""Similarity search over the embeddings table (list<float> column).

- ``knn_cosine``: brute-force cosine top-k — the baseline: the (tiny) query
  matrix is broadcast via ``ray.put`` once, each map_batches task does one
  float64 matmul against its batch, and the driver k-way-merges per-batch
  top-k candidates.  Streams the corpus; never materializes similarities.
- ``lsh_knn_cosine``: a scale path — random-hyperplane LSH bucketing
  (one groupby on the bucket key), exact re-rank inside candidate buckets.
  Recall < 1 by design; the exactness contract lives with ``knn_cosine``.
- ``ivf_knn_cosine``: the other scale path — inverted lists under a
  distributed spherical-k-means coarse quantizer (``kmeans_fit``: one
  streaming pass per Lloyd iteration, only C x dim partials move);
  queries probe nprobe lists, ~nprobe/C of brute-force work, no shuffle.
- ``embedding_neardup``: all pairs with cosine >= threshold, LSH-blocked
  (multi-probe over sign-flip neighbors) with exact verify inside buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data

_HYPERPLANE_SEED = 0x5EED

from ..util import pairs_table, stage_fn


def emb_dataset(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(len(col), dim)


def _query_matrix(sf_dir: str, query_ids: list[int]) -> tuple[np.ndarray, list[int]]:
    import pyarrow.dataset as pads

    dsx = pads.dataset(f"{sf_dir}/embeddings.parquet")
    t = dsx.to_table(filter=pads.field("vec_id").isin(query_ids))
    order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
    q = _to_matrix(t["embedding"])[order]
    ids = t["vec_id"].to_numpy(zero_copy_only=False)[order].tolist()
    return q, ids


def knn_cosine(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10
) -> pa.Table:
    """Exact cosine top-k: (qid, rank, vec_id). Self-matches included.

    Ties broken by ascending vec_id; ranks are deterministic ints so the
    DuckDB oracle hash-compares exactly.
    """
    q, qids = _query_matrix(sf_dir, list(query_ids))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _to_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qm @ m.T  # (nq, batch)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        rows = []
        top = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            s = sims[qi]
            idx = np.lexsort((ids, -s))[:top]
            rows.append((qi, ids[idx], s[idx]))
        return pa.table(
            {
                "qi": pa.array(
                    np.repeat([r[0] for r in rows], [len(r[1]) for r in rows]),
                    pa.int32(),
                ),
                "vec_id": pa.array(np.concatenate([r[1] for r in rows]), pa.int64()),
                "sim": pa.array(np.concatenate([r[2] for r in rows]), pa.float64()),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        # tree-fold level: per-query top-k over ~64 partial top-ks per
        # task, bounding the driver merge at cluster scale (same
        # lexsort tie-break as the scorer, so the merge is lossless)
        qi_arr = batch["qi"].to_numpy(zero_copy_only=False)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = batch["sim"].to_numpy(zero_copy_only=False)
        keep = []
        for qi in np.unique(qi_arr):
            sel = np.flatnonzero(qi_arr == qi)
            keep.append(sel[np.lexsort((ids[sel], -sims[sel]))[:k]])
        idx = np.concatenate(keep) if keep else np.empty(0, np.int64)
        return batch.take(pa.array(np.sort(idx)))

    cand = (
        emb_dataset(sf_dir)
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .map_batches(fold, batch_format="pyarrow", batch_size=64 * len(query_ids) * k)
    )
    df = cand.to_pandas()  # (nq * k * nfolds) candidate rows — tiny
    out_q, out_r, out_v = [], [], []
    for qi, qid in enumerate(qids):
        sub = df[df["qi"] == qi]
        best = heapq.nsmallest(
            k, zip(-sub["sim"].to_numpy(), sub["vec_id"].to_numpy())
        )
        for r, (negs, vid) in enumerate(best, 1):
            out_q.append(qid)
            out_r.append(r)
            out_v.append(int(vid))
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )


def _hyperplanes(dim: int, nbits: int) -> np.ndarray:
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    return rng.standard_normal((nbits, dim))


def lsh_knn_cosine(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10, nbits: int = 8
) -> pa.Table:
    """LSH-bucketed ANN: candidates share the query's hyperplane sign key
    (multi-probe: Hamming<=1 neighbor buckets).  Returns (qid, rank, vec_id);
    approximate — recall measured against knn_cosine in tests."""
    q, qids = _query_matrix(sf_dir, list(query_ids))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    H = _hyperplanes(q.shape[1], nbits)
    qsig = (qn @ H.T > 0).astype(np.uint64)
    qkeys = []
    pow2 = (np.full(nbits, 1, dtype=np.uint64) << np.arange(nbits, dtype=np.uint64))
    for qi in range(len(qids)):
        base = int((qsig[qi] * pow2).sum())
        probes = {base}
        for b in range(nbits):  # multi-probe out to Hamming distance 2
            probes.add(base ^ (1 << b))
            for b2 in range(b + 1, nbits):
                probes.add(base ^ (1 << b) ^ (1 << b2))
        qkeys.append(probes)
    all_probes = np.array(sorted(set().union(*qkeys)), dtype=np.int64)
    probes_ref = ray.put((qn, all_probes))

    def score(batch: pa.Table) -> pa.Table:
        qm, probes = ray.get(probes_ref)
        m = _to_matrix(batch["embedding"])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sig = (mn @ H.T > 0).astype(np.uint64)
        keys = (sig * pow2[None, :]).sum(axis=1).astype(np.int64)
        mask = np.isin(keys, probes)
        if not mask.any():
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                    "sims": pa.array([], pa.list_(pa.float64())),
                }
            )
        sims = qm @ mn[mask].T
        return pa.table(
            {
                "vec_id": batch["vec_id"].filter(pa.array(mask)),
                "key": pa.array(keys[mask].astype(np.int64)),
                "sims": pa.array(list(sims.T)),
            }
        )

    cand = emb_dataset(sf_dir).map_batches(score, batch_format="pyarrow", batch_size=4096)
    df = cand.to_pandas()
    out_q, out_r, out_v = [], [], []
    for qi, qid in enumerate(qids):
        sel = df[df["key"].isin(qkeys[qi])]
        if len(sel):
            sims = np.array([s[qi] for s in sel["sims"]])
            ids = sel["vec_id"].to_numpy()
            idx = np.lexsort((ids, -sims))[:k]
            for r, j in enumerate(idx, 1):
                out_q.append(qid)
                out_r.append(r)
                out_v.append(int(ids[j]))
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )


def lsh_knn_consistency(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10
) -> pa.Table:
    """Invariants of the LSH ANN path, checked against exact recomputation
    from the raw vectors: per query, (a) the reported order must be
    non-increasing in TRUE cosine with ascending-vec_id tie-break, and
    (b) rank 1 must be the query vector itself (it always lands in its own
    base bucket, its self-similarity is 1.0, and the tie-break favors its
    lower id).  Returns (qid, n_rank_inversions, top1_is_self) — the oracle
    pins (0, 1).  Recall itself is probabilistic — measured in pytest, not
    SQL-pinned."""
    return _ann_consistency(sf_dir, lsh_knn_cosine(sf_dir, query_ids, k), query_ids)


def ivf_knn_consistency(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10
) -> pa.Table:
    """Same invariants for the IVF path (top-1 self holds because a corpus
    query's own inverted list is its nearest centroid, probed first)."""
    return _ann_consistency(sf_dir, ivf_knn_cosine(sf_dir, query_ids, k), query_ids)


def _ann_consistency(
    sf_dir: str, approx: pa.Table, query_ids: tuple[int, ...]
) -> pa.Table:
    q, qids = _query_matrix(sf_dir, list(query_ids))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)

    t = emb_dataset(sf_dir).take_all()
    ids_all = np.array([r["vec_id"] for r in t], dtype=np.int64)
    m_all = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in t])
    m_all = m_all / np.linalg.norm(m_all, axis=1, keepdims=True)
    pos_of = {int(v): i for i, v in enumerate(ids_all)}

    ap = approx.to_pandas()
    out_q, out_inv, out_top = [], [], []
    for qi, qid in enumerate(qids):
        sub = ap[ap["qid"] == qid].sort_values("rank")
        vids = sub["vec_id"].to_numpy()
        sims = np.array([float(qn[qi] @ m_all[pos_of[int(v)]]) for v in vids])
        n_inv = int(
            np.sum(
                (sims[1:] > sims[:-1])
                | ((sims[1:] == sims[:-1]) & (vids[1:] < vids[:-1]))
            )
        )
        out_q.append(int(qid))
        out_inv.append(n_inv)
        out_top.append(int(len(vids) > 0 and int(vids[0]) == int(qid)))
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            "n_rank_inversions": pa.array(out_inv, pa.int64()),
            "top1_is_self": pa.array(out_top, pa.int64()),
        }
    )


def embedding_neardup(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """EXACT all-pairs cosine >= threshold: (a, b) — oracle-checkable.

    Each map_batches task multiplies its batch against the broadcast
    full matrix (``ray.put`` once) and keeps pairs with the other id
    strictly greater — each pair emitted exactly once, no shuffle.
    Inherently O(N^2/batch) work: this is the *correctness* baseline;
    ``embedding_neardup_lsh`` is the sub-quadratic scale path.
    """
    t = emb_dataset(sf_dir).take_all()
    ids_all = np.array([r["vec_id"] for r in t], dtype=np.int64)
    m_all = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in t])
    m_all = m_all / np.linalg.norm(m_all, axis=1, keepdims=True)
    ref = ray.put((ids_all, m_all))

    def pairs(batch: pa.Table) -> pa.Table:
        oids, om = ray.get(ref)
        m = _to_matrix(batch["embedding"])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = mn @ om.T
        ii, jj = np.where(sims >= threshold)
        keep = oids[jj] > ids[ii]
        return pa.table(
            {
                "a": pa.array(ids[ii][keep], pa.int64()),
                "b": pa.array(oids[jj][keep], pa.int64()),
            }
        )

    return pairs_table(
        emb_dataset(sf_dir).map_batches(pairs, batch_format="pyarrow", batch_size=2048)
    )


def embedding_lsh_consistency(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Containment invariant: the LSH-blocked near-dup pairs verify with the
    TRUE cosine inside buckets, so every emitted pair must also be an exact
    threshold pair — precision is exactly 1.  Returns one row
    (n_exact_pairs, n_lsh_false_pairs); the oracle recomputes the exact pair
    count in SQL and pins false pairs at 0.  (Recall is probabilistic —
    measured in pytest.)"""
    exact_t = embedding_neardup(sf_dir, threshold)
    exact = set(zip(exact_t["a"].to_pylist(), exact_t["b"].to_pylist()))
    lsh_t = embedding_neardup_lsh(sf_dir, threshold)
    lsh = set(zip(lsh_t["a"].to_pylist(), lsh_t["b"].to_pylist()))
    return pa.table(
        {
            "n_exact_pairs": pa.array([len(exact)], pa.int64()),
            "n_lsh_false_pairs": pa.array([len(lsh - exact)], pa.int64()),
        }
    )


class _HyperplaneSign:
    """Sign stage: hyperplanes built once per worker process (deterministic
    seed, so every worker holds the same H); emits base + Hamming-1 probes.

    Only ``(key, vec_id)`` crosses the shuffle — 16 bytes per probe row
    instead of the full unit vector (round 2 shipped each vector
    x(nbits+1) through the groupby, ~dim x 8 bytes per row); the verify
    stage refetches vectors for the surviving candidates only."""

    def __init__(self, nbits: int):
        self.nbits = nbits
        self.H: np.ndarray | None = None
        self.pow2 = np.full(nbits, 1, dtype=np.uint64) << np.arange(
            nbits, dtype=np.uint64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        nbits = self.nbits
        m = _to_matrix(batch["embedding"])
        if self.H is None or self.H.shape[1] != m.shape[1]:
            # keyed on dim: stage_fn reuses the instance across datasets
            self.H = _hyperplanes(m.shape[1], nbits)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sig = (mn @ self.H.T > 0).astype(np.uint64)
        base = (sig * self.pow2[None, :]).sum(axis=1).astype(np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keys = [base]
        for b in range(nbits):
            keys.append(base ^ (1 << b))
        return pa.table(
            {
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "vec_id": pa.array(np.tile(ids, nbits + 1), pa.int64()),
            }
        )


def _unit_lookup(tbl: pa.Table):
    """A (vec_id, embedding) partition -> (sorted ids, unit matrix)."""
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    m = _to_matrix(tbl["embedding"])[order]
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return ids[order], m


def _verify_cosine_tiles(t: pa.Table, parts_refs: tuple, threshold: float) -> pa.Table:
    """Blocked tile verify for the embedding near-dup join (the repo-wide
    pattern with the exact-cosine einsum kernel)."""
    from ..util import dedup_tile_groups

    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    grouped = dedup_tile_groups(t)
    if grouped is None:
        return empty
    a, b, pb_a, pb_b, starts, ends = grouped
    cache: dict = {}
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        pia, pib = int(pb_a[s]), int(pb_b[s])
        for p in (pia, pib):
            if p not in cache:
                cache[p] = _unit_lookup(ray.get(parts_refs[p]))
        ids_a, m_a = cache[pia]
        ids_b, m_b = cache[pib]
        ia = np.searchsorted(ids_a, a[s:e])
        ib = np.searchsorted(ids_b, b[s:e])
        sims = np.einsum("ij,ij->i", m_a[ia], m_b[ib])
        keep = sims >= threshold
        out_a.append(a[s:e][keep])
        out_b.append(b[s:e][keep])
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def embedding_neardup_lsh(
    sf_dir: str, threshold: float = 0.45, nbits: int = 6
) -> pa.Table:
    """LSH-blocked near-dup pairs with cosine >= threshold: (a, b).

    Hyperplane-LSH blocking (nbits-bit key, multi-probe Hamming<=1 — two
    vectors collide when their sign keys differ by <= 2 bits) + exact
    verify.  Three stages, only fixed-width (key, vec_id) rows cross the
    shuffle:

    1. sign: (key, vec_id) probe rows, nbits+1 per vector.
    2. candidates: groupby(key) -> unique id pairs (vectorized triu).
    3. verify: candidate vectors are refetched via a broadcast-id filter
       on the scan, and exact cosine is computed per candidate pair in
       ``map_batches`` over the (deduped) pair table — so every emitted
       pair is exact (precision 1; recall measured in tests).

    Approximate: recall vs ``embedding_neardup`` is measured in tests.
    """

    from ..util import bounded_pair_dataset

    # candidate pairs STAY in the object store (a hot bucket is O(members²)
    # pairs — driver-collecting them before the verify cut is the OOM
    # shape), and the per-bucket emit goes through the shared tile
    # machinery (bounded descriptors + small-batch expansion — a hot key
    # never materializes O(g^2) rows in one group call), and the verify
    # is the repo-wide blocked tile shuffle: unit vectors hash-partition
    # once as ObjectRefs, the pair stream shuffles ONCE on its
    # (partition-of-a, of-b) tile key with in-bucket global dedup, and
    # each task pulls only its two vector partitions — no candidate ids
    # or vectors ever fold to the driver or broadcast whole.
    import functools

    from ..util import (
        VERIFY_PARTS,
        dedup_tile_groups,
        hash_groupby,
        hash_partition_refs,
        tag_pair_tiles,
    )

    cand_ds = bounded_pair_dataset(
        emb_dataset(sf_dir).map_batches(
            stage_fn(_HyperplaneSign, nbits), batch_format="pyarrow",
            batch_size=4096,
        ),
        ["key"],
        id_col="vec_id",
    )
    parts_refs = hash_partition_refs(
        emb_dataset(sf_dir).materialize(), ["vec_id"], VERIFY_PARTS
    )
    out = hash_groupby(
        cand_ds.map_batches(
            functools.partial(tag_pair_tiles, n_parts=VERIFY_PARTS),
            batch_format="pyarrow",
        ),
        keys=["pb_a", "pb_b"],
        finalize=functools.partial(
            _verify_cosine_tiles, parts_refs=parts_refs, threshold=threshold
        ),
        num_partitions=64,
    )
    return pairs_table(out)


# ------------------------------------------------------------------- IVF


def kmeans_fit(
    sf_dir: str, n_centroids: int = 16, iters: int = 5
) -> np.ndarray:
    """Distributed spherical k-means over the embeddings: the coarse
    quantizer for IVF.  Each Lloyd iteration is one streaming pass —
    centroids broadcast via ``ray.put``, every batch emits per-centroid
    (sum-vector, count) partials, the driver folds C rows per batch (C x
    dim floats, never the vectors).  Init = the n_centroids lowest vec_ids
    (deterministic).  Returns unit-norm centroids (C, dim)."""
    import pyarrow.dataset as pads

    dsx = pads.dataset(f"{sf_dir}/embeddings.parquet")
    head = dsx.head(n_centroids, columns=["vec_id", "embedding"])
    order = np.argsort(head["vec_id"].to_numpy(zero_copy_only=False))
    cents = _to_matrix(head["embedding"])[order]
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _to_matrix(batch["embedding"])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(len(c)), pa.int32()),
                    "count": pa.array(counts, pa.int64()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = pa.concat_tables(
            ray.get(
                emb_dataset(sf_dir)
                .map_batches(partial, batch_format="pyarrow", batch_size=4096)
                .to_arrow_refs()
            )
        )
        cid = parts["cid"].to_numpy(zero_copy_only=False)
        cnt = parts["count"].to_numpy(zero_copy_only=False)
        vsum = np.asarray(parts["vsum"].combine_chunks().flatten()).reshape(
            len(parts), cents.shape[1]
        )
        sums = np.zeros_like(cents)
        np.add.at(sums, cid, vsum)
        counts = np.bincount(cid, weights=cnt, minlength=len(cents)).astype(np.int64)
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def ivf_knn_cosine(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2),
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> pa.Table:
    """IVF ANN: vectors partition into inverted lists by nearest k-means
    centroid; a query scores only its nprobe closest lists.  Returns
    (qid, rank, vec_id) like ``knn_cosine``; recall measured in pytest,
    order/self invariants pinned by ``ivf_knn_consistency``.

    Scale shape: the trained quantizer and query matrix broadcast once;
    each batch assigns itself to lists and scores only rows probed by
    some query — work is ~nprobe/n_centroids of brute force with zero
    shuffle (assignment happens inline, lists never materialize)."""
    cents = kmeans_fit(sf_dir, n_centroids)
    q, qids = _query_matrix(sf_dir, list(query_ids))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qprobes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qn, qprobes, cents))

    def score(batch: pa.Table) -> pa.Table:
        qm, probes, c = ray.get(ref)
        m = _to_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(m @ c.T, axis=1)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = qm @ m.T
        out_qi, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            s, v = sims[qi][mask], ids[mask]
            idx = np.lexsort((v, -s))[: min(k, len(v))]
            out_qi.append(np.full(len(idx), qi, dtype=np.int32))
            out_v.append(v[idx])
            out_s.append(s[idx])
        if not out_qi:
            return pa.table(
                {
                    "qi": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_qi), pa.int32()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    df = (
        emb_dataset(sf_dir)
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out_q, out_r, out_v = [], [], []
    for qi, qid in enumerate(qids):
        sub = df[df["qi"] == qi]
        best = heapq.nsmallest(
            k, zip(-sub["sim"].to_numpy(), sub["vec_id"].to_numpy())
        )
        for r, (negs, vid) in enumerate(best, 1):
            out_q.append(qid)
            out_r.append(r)
            out_v.append(int(vid))
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )


def pq_train(
    sf_dir: str, m_sub: int = 8, n_codes: int = 16, sample: int = 256, iters: int = 8
) -> np.ndarray:
    """Product-quantization codebooks: the dim splits into ``m_sub``
    subspaces, each with its own ``n_codes``-centroid k-means trained on a
    deterministic sample (the ``sample`` lowest vec_ids — codebook
    training is sample-based in practice; the full corpus only gets
    ENCODED).  Returns (m_sub, n_codes, dim/m_sub) float64."""
    import pyarrow.dataset as pads

    dsx = pads.dataset(f"{sf_dir}/embeddings.parquet")
    head = dsx.head(sample, columns=["vec_id", "embedding"])
    order = np.argsort(head["vec_id"].to_numpy(zero_copy_only=False))
    m = _to_matrix(head["embedding"])[order]
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    dim = m.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d_sub = dim // m_sub
    books = np.empty((m_sub, n_codes, d_sub))
    for s in range(m_sub):
        x = m[:, s * d_sub : (s + 1) * d_sub]
        c = x[:n_codes].copy()  # deterministic init: lowest vec_ids
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(n_codes):
                sel = assign == j
                if sel.any():
                    c[j] = x[sel].mean(axis=0)
        books[s] = c
    return books


def pq_knn_cosine(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2),
    k: int = 10,
    m_sub: int = 8,
    n_codes: int = 16,
) -> pa.Table:
    """Product-quantization ANN with exact re-rank: (qid, rank, vec_id).

    The memory-compression scale path — each vector becomes ``m_sub``
    uint8 codes (8 B here vs 256 B raw), and the asymmetric-distance scan
    is ``m_sub`` LUT adds per vector instead of a dim-length dot product.
    Per batch: encode inline, score every query against the codes via a
    broadcast (nq, m_sub, n_codes) LUT, keep 4k local candidates with
    their TRUE vectors' exact cosine recomputed batch-locally (the refine
    step costs exact-dot only on candidates), driver merges exact scores.
    Final ordering is therefore exact over the PQ-selected candidate set
    — ``pq_knn_consistency`` pins zero inversions + top-1 self.
    """
    books = pq_train(sf_dir, m_sub, n_codes)
    q, qids = _query_matrix(sf_dir, list(query_ids))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    d_sub = books.shape[2]
    # LUT[qi, s, code] = q_s . codebook[s, code]; approx sim = sum_s LUT
    lut = np.stack(
        [qn[:, s * d_sub : (s + 1) * d_sub] @ books[s].T for s in range(m_sub)],
        axis=1,
    )
    ref = ray.put((qn, lut, books))
    cand = 8 * k  # refine pool per batch; recall@10 0.63 (4k) -> 0.73 here

    def score(batch: pa.Table) -> pa.Table:
        qm, lt, bk = ray.get(ref)
        m = _to_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        n, ms, nc = len(m), bk.shape[0], bk.shape[1]
        ds_ = bk.shape[2]
        codes = np.empty((n, ms), dtype=np.int64)
        for s in range(ms):
            x = m[:, s * ds_ : (s + 1) * ds_]
            d2 = (
                (x**2).sum(axis=1)[:, None]
                - 2.0 * (x @ bk[s].T)
                + (bk[s] ** 2).sum(axis=1)[None, :]
            )
            codes[:, s] = np.argmin(d2, axis=1)
        # approx sims: gather LUT per subspace and sum
        out_qi, out_v, out_s = [], [], []
        for qi in range(len(qm)):
            approx = lt[qi][np.arange(ms)[None, :], codes].sum(axis=1)
            idx = np.lexsort((ids, -approx))[: min(cand, n)]
            exact = m[idx] @ qm[qi]  # refine: true cosine on candidates
            out_qi.append(np.full(len(idx), qi, dtype=np.int32))
            out_v.append(ids[idx])
            out_s.append(exact)
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_qi), pa.int32()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    df = (
        emb_dataset(sf_dir)
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out_q, out_r, out_v = [], [], []
    for qi, qid in enumerate(qids):
        sub = df[df["qi"] == qi]
        best = heapq.nsmallest(
            k, zip(-sub["sim"].to_numpy(), sub["vec_id"].to_numpy())
        )
        for r, (negs, vid) in enumerate(best, 1):
            out_q.append(qid)
            out_r.append(r)
            out_v.append(int(vid))
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )


def pq_knn_consistency(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10
) -> pa.Table:
    """Same invariants for the PQ path: zero inversions (final ordering is
    exact cosine over candidates) and top-1 self (a query's own vector
    maximizes every subspace LUT, so it always survives the candidate
    cut)."""
    return _ann_consistency(sf_dir, pq_knn_cosine(sf_dir, query_ids, k), query_ids)


# -------------------------------------------------- nearest-centroid classify


_CC_SCALE = 1_000_000  # quantization: floor(x * 1e6 + 0.5), int64-exact


def centroid_classify(sf_dir: str) -> pa.Table:
    """(label, predicted, n) confusion counts of a nearest-centroid
    classifier over the labeled embeddings — fully INTEGER-deterministic,
    so the SQL oracle hash-matches exactly.

    Floats never survive a cross-engine comparison (parallel partial sums
    reorder additions), so everything is quantized first: q = floor(x*1e6
    + 0.5) per element (identical IEEE arithmetic in numpy and DuckDB),
    per-label centroids are integer floor-divided sums (order-independent
    BIGINT addition), and assignment minimizes the exact integer squared
    distance with ascending-label tie-break.

    Shape: one map_batches pass emits per-label (count, sum-vector)
    partials — O(labels x dim) per batch, folded on the driver (10x64
    here; a tree fold past ~1e4 labels); centroids broadcast once; a
    second pass assigns and emits 10x10 confusion partials.  No shuffle.
    """

    def q16(m: np.ndarray) -> np.ndarray:
        return np.floor(m * _CC_SCALE + 0.5).astype(np.int64)

    src = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partial_sums(batch: pa.Table) -> pa.Table:
        q = q16(_to_matrix(batch["embedding"]))
        labs = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_lab = np.unique(labs)
        sums = np.zeros((len(out_lab), q.shape[1]), np.int64)
        cnts = np.zeros(len(out_lab), np.int64)
        pos = np.searchsorted(out_lab, labs)
        np.add.at(sums, pos, q)
        np.add.at(cnts, pos, 1)
        return pa.table(
            {
                "label": pa.array(out_lab, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
                "sums": pa.array([s.tobytes() for s in sums], pa.binary()),
            }
        )

    parts = src.map_batches(
        partial_sums, batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    labels = np.sort(parts["label"].unique())
    dim = len(np.frombuffer(parts["sums"].iloc[0], np.int64))
    part_sums = np.frombuffer(b"".join(parts["sums"]), np.int64).reshape(
        len(parts), dim
    )
    pos = np.searchsorted(labels, parts["label"].to_numpy())
    sums = np.zeros((len(labels), dim), np.int64)
    cnts = np.zeros(len(labels), np.int64)
    np.add.at(sums, pos, part_sums)
    np.add.at(cnts, pos, parts["cnt"].to_numpy())
    # TRUNCATING division toward zero — DuckDB's BIGINT // truncates while
    # numpy's // floors; they differ on negative sums (-7//2: numpy -4,
    # DuckDB -3), so mirror the SQL semantics explicitly
    cents = np.sign(sums) * (np.abs(sums) // cnts[:, None])
    cents_ref = ray.put((labels, cents))

    def assign(batch: pa.Table) -> pa.Table:
        labs_c, m = ray.get(cents_ref)
        q = q16(_to_matrix(batch["embedding"]))
        # exact integer squared distances; values fit int64 (<= 64 * (4e6)^2)
        d2 = ((q[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
        pred = labs_c[np.argmin(d2, axis=1)]  # first min = smallest label
        true = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        # positions in the sorted label array, NOT raw label values — raw
        # values overflow the dense matrix when labels aren't 0..L-1
        key = np.searchsorted(labs_c, true) * len(labs_c) + np.searchsorted(
            labs_c, pred
        )
        cnt = np.bincount(key, minlength=len(labs_c) ** 2).astype(np.int64)
        return pa.table({"confusion": pa.array([cnt.tobytes()], pa.binary())})

    conf_parts = src.map_batches(
        assign, batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    conf = np.zeros(len(labels) ** 2, np.int64)
    for b in conf_parts["confusion"]:
        conf += np.frombuffer(b, np.int64)
    conf = conf.reshape(len(labels), len(labels))
    rows = np.nonzero(conf)
    return pa.table(
        {
            "label": pa.array(labels[rows[0]], pa.int64()),
            "predicted": pa.array(labels[rows[1]], pa.int64()),
            "n": pa.array(conf[rows], pa.int64()),
        }
    )


def centroid_classify_sql_oracle() -> str:
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 generate_subscripts(embedding, 1) AS idx,
                 -- widen to DOUBLE first: the column is float32, and the
                 -- engine quantizes after the identical float32->float64
                 -- widening; float32 arithmetic here would diverge
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_CC_SCALE}
                            + 0.5) AS BIGINT) AS q
          FROM embeddings
        ),
        cent AS (
          SELECT label, idx,
                 CAST(sum(q) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
          FROM e GROUP BY label, idx
        ),
        dist AS (
          SELECT e.vec_id, e.label AS true_label, c.label AS cand,
                 sum((e.q - c.m) * (e.q - c.m)) AS d2
          FROM e JOIN cent c USING (idx)
          GROUP BY e.vec_id, e.label, c.label
        ),
        pred AS (
          SELECT vec_id, true_label, cand,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2 ASC, cand ASC) AS rn
          FROM dist
        )
        SELECT true_label AS label, cand AS predicted,
               CAST(count(*) AS BIGINT) AS n
        FROM pred WHERE rn = 1
        GROUP BY true_label, cand
    """


# -------------------------------------------------------------- SemDeDup

SEMDEDUP_THRESHOLD = 0.45


def semdedup(
    sf_dir: str, n_centroids: int = 16, threshold: float = SEMDEDUP_THRESHOLD
) -> ray.data.Dataset:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embeddings with the distributed k-means quantizer, then within each
    cluster drop every vector that has cosine >= threshold to an
    earlier-vec_id vector of the same cluster (the earliest such vector is
    recorded as the witness).

    One row per vector: (vec_id, cluster, dropped 0/1, witness vec_id or
    -1).  Scale shape: centroids broadcast once; assignment is a stateless
    map; the only shuffle is the groupby(cluster); each cluster dedups
    independently with one (g x g) gram matrix — at 100 TB you raise
    n_centroids so g = N/C stays bounded (SemDeDup's published config uses
    ~100k clusters for exactly this reason), and clusters parallelize
    across the pool.  Deterministic: k-means init is the lowest vec_ids,
    ties in the drop rule resolve to the earliest witness."""
    cents = kmeans_fit(sf_dir, n_centroids)
    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _to_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cid = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return pa.table(
            {
                "cluster": pa.array(cid),
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
            }
        )

    def group_dedup(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        m = _to_matrix(group["embedding"])[order]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        # strictly-lower-triangular hits: hit[i, j<i] = sim >= threshold
        hit = np.tril(m @ m.T >= threshold, k=-1)
        dropped = hit.any(axis=1)
        witness = np.where(dropped, ids[np.argmax(hit, axis=1)], -1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    np.full(len(ids), group["cluster"][0].as_py(), np.int32)
                ),
                "dropped": pa.array(dropped.astype(np.int64)),
                "witness": pa.array(witness.astype(np.int64)),
            }
        )

    return (
        emb_dataset(sf_dir)
        .map_batches(assign, batch_format="pyarrow", batch_size=4096)
        .groupby("cluster")
        .map_groups(group_dedup, batch_format="pyarrow")
    )


def semdedup_consistency(
    sf_dir: str, n_centroids: int = 16, threshold: float = SEMDEDUP_THRESHOLD
) -> pa.Table:
    """Recompute-and-count invariants of ``semdedup`` (constant oracle like
    the *_knn_consistency family; the discriminating brute-force equality
    and planted-duplicate recall live in tests/test_training_ops.py):

    - n_witness_violations: dropped rows whose recorded witness is not an
      earlier vec_id with cosine >= threshold — re-verified against the
      re-fetched witness vectors in a distributed map_batches pass (the
      witness relation is 3 ints/vec, broadcast once via ray.put).
    - n_flag_mismatches: per-cluster drop flags re-derived from the raw
      embeddings with an independent running-prefix formulation and
      compared to the claimed flags.
    """
    claimed = semdedup(sf_dir, n_centroids, threshold).to_arrow_refs()
    claimed = pa.concat_tables(ray.get(claimed))
    ids = claimed["vec_id"].to_numpy(zero_copy_only=False)
    srt = np.argsort(ids)  # searchsorted below needs globally sorted ids
    ids = ids[srt]
    dropped = claimed["dropped"].to_numpy(zero_copy_only=False)[srt]
    witness = claimed["witness"].to_numpy(zero_copy_only=False)[srt]
    cluster = claimed["cluster"].to_numpy(zero_copy_only=False)[srt]

    # --- witness verify: fetch witness vectors, one broadcast + one pass
    wit_ids = np.unique(witness[dropped == 1])
    wit_ref = ray.put(wit_ids)

    def fetch(batch: pa.Table) -> pa.Table:
        want = ray.get(wit_ref)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(vid, want)
        return batch.filter(pa.array(mask))

    wt = pa.concat_tables(
        ray.get(
            emb_dataset(sf_dir)
            .map_batches(fetch, batch_format="pyarrow", batch_size=4096)
            .to_arrow_refs()
        )
    )
    wvid = wt["vec_id"].to_numpy(zero_copy_only=False)
    wsrt = np.argsort(wvid)
    wvid = wvid[wsrt]
    wm = _to_matrix(wt["embedding"])[wsrt]
    wm = wm / np.linalg.norm(wm, axis=1, keepdims=True)
    pair_ref = ray.put((ids[dropped == 1], witness[dropped == 1], wvid, wm))

    def verify(batch: pa.Table) -> pa.Table:
        d_ids, d_wit, w_ids, w_mat = ray.get(pair_ref)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(d_ids) == 0:
            return pa.table({"viol": pa.array([0], pa.int64())})
        pos = np.clip(np.searchsorted(d_ids, vid), 0, len(d_ids) - 1)
        sel = d_ids[pos] == vid
        if not np.any(sel):
            return pa.table({"viol": pa.array([0], pa.int64())})
        m = _to_matrix(batch["embedding"])[sel]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        w_of = d_wit[pos[sel]]
        wrow = np.searchsorted(w_ids, w_of)
        cos = np.einsum("ij,ij->i", m, w_mat[wrow])
        bad = (cos < threshold) | (w_of >= vid[sel])
        return pa.table({"viol": pa.array([int(bad.sum())], pa.int64())})

    viols = pa.concat_tables(
        ray.get(
            emb_dataset(sf_dir)
            .map_batches(verify, batch_format="pyarrow", batch_size=4096)
            .to_arrow_refs()
        )
    )
    n_witness_violations = int(viols["viol"].to_numpy(zero_copy_only=False).sum())

    # --- flag re-derivation: independent prefix formulation per cluster
    claim_ref = ray.put((ids, dropped, cluster))
    cents = kmeans_fit(sf_dir, n_centroids)
    cref = ray.put(cents)

    def assign_again(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _to_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cid = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return pa.table(
            {
                "cluster": pa.array(cid),
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
            }
        )

    def group_check(group: pa.Table) -> pa.Table:
        c_ids, c_drop, _c_cl = ray.get(claim_ref)
        gid = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(gid)
        gid = gid[order]
        m = _to_matrix(group["embedding"])[order]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        # prefix formulation: grow the kept-prefix row by row; i is dropped
        # iff its max cosine against ALL earlier rows (kept or dropped)
        # reaches the threshold — evaluated as a running row scan, not tril
        drop2 = np.zeros(len(gid), dtype=bool)
        for i in range(1, len(gid)):
            drop2[i] = bool((m[:i] @ m[i] >= threshold).any())
        pos = np.searchsorted(c_ids, gid)
        mism = int((c_drop[pos] != drop2.astype(np.int64)).sum())
        return pa.table({"mism": pa.array([mism], pa.int64())})

    mm = pa.concat_tables(
        ray.get(
            emb_dataset(sf_dir)
            .map_batches(assign_again, batch_format="pyarrow", batch_size=4096)
            .groupby("cluster")
            .map_groups(group_check, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )
    n_flag_mismatches = int(mm["mism"].to_numpy(zero_copy_only=False).sum())
    return pa.table(
        {
            "n_witness_violations": pa.array([n_witness_violations], pa.int64()),
            "n_flag_mismatches": pa.array([n_flag_mismatches], pa.int64()),
        }
    )


def quantize_embeddings(sf_dir: str) -> ray.data.Dataset:
    """Symmetric int8 quantization of the embedding column — the storage
    transform a 100 TB vector corpus applies before anything else (4x
    smaller, SIMD-friendly).  Per vector: scale = max|v|, q_d =
    round(v_d / scale * 127) with DuckDB's half-away rounding; zero
    vectors quantize to zeros.  Output exploded as (vec_id, dim, q) so
    the SQL oracle can hash every component; pure per-batch map — no
    shuffle, nothing leaves the worker but int8s."""

    def quant(t: pa.Table) -> pa.Table:
        m = _to_matrix(t["embedding"])
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        scale = np.abs(m).max(axis=1, keepdims=True)
        safe = np.where(scale == 0.0, 1.0, scale)
        x = m / safe * 127.0
        q = np.sign(x) * np.floor(np.abs(x) + 0.5)  # round half away from zero
        q = np.where(scale == 0.0, 0.0, q).astype(np.int64)
        n, d = m.shape
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
                "q": pa.array(q.reshape(-1), pa.int64()),
            }
        )

    return emb_dataset(sf_dir).map_batches(quant, batch_format="pyarrow")


def quantize_embeddings_sql_oracle() -> str:
    return """
        WITH e AS (
          -- engine maths runs in float64 (_to_matrix upcasts); the oracle
          -- must too, or FLOAT division flips .5-boundary components
          SELECT vec_id,
                 CAST(unnest(embedding) AS DOUBLE) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings
        ),
        s AS (SELECT vec_id, max(abs(v)) AS scale FROM e GROUP BY vec_id)
        SELECT e.vec_id,
               CAST(e.dim AS BIGINT) AS dim,
               CASE WHEN s.scale = 0 THEN 0
                    ELSE CAST(round(e.v / s.scale * 127) AS BIGINT) END AS q
        FROM e JOIN s USING (vec_id)
    """


def knn_filtered(
    sf_dir: str,
    lang: str = "en",
    query_ids: tuple[int, ...] = (0, 1, 2),
    k: int = 10,
) -> pa.Table:
    """FILTERED vector search (the Elasticsearch knn-with-filter /
    pgvector WHERE shape), exact-cosine baseline: top-k restricted to
    vectors whose paired document (``vec_id == doc_id``, the testdata
    contract) is in ``lang`` — PRE-filter semantics, so the filter
    applies before the top-k and k survivors always come back (post-
    filtering a plain top-k can return fewer).

    (qid, rank, vec_id).  The allowed-id set comes from one
    predicate-pushdown read of the documents id column, broadcast once
    (``ray.put``) and applied per batch with a vectorized membership
    test; at 10^12 rows the broadcast becomes the bloom-semi-join /
    bucketed-join pattern (``relational.bloom_semi_join``), the scan
    shape is unchanged.  Ties by ascending vec_id; ranks exact ints.
    """
    import pyarrow.dataset as pads

    q, qids = _query_matrix(sf_dir, list(query_ids))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    allowed = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(columns=["doc_id"], filter=pads.field("lang") == lang)
    )["doc_id"].to_numpy(zero_copy_only=False)
    allowed = np.sort(allowed)
    ctx_ref = ray.put((qn, allowed))

    def score(batch: pa.Table) -> pa.Table:
        qm, ok = ray.get(ctx_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(ok):
            pos = np.minimum(np.searchsorted(ok, ids), len(ok) - 1)
            keep = ok[pos] == ids
        else:
            keep = np.zeros(len(ids), bool)
        b = batch.filter(pa.array(keep))
        if b.num_rows == 0:
            return pa.table(
                {
                    "qi": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        m = _to_matrix(b["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qm @ m.T
        bids = b["vec_id"].to_numpy(zero_copy_only=False)
        rows = []
        top = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            s = sims[qi]
            idx = np.lexsort((bids, -s))[:top]
            rows.append((qi, bids[idx], s[idx]))
        return pa.table(
            {
                "qi": pa.array(
                    np.repeat([r[0] for r in rows], [len(r[1]) for r in rows]),
                    pa.int32(),
                ),
                "vec_id": pa.array(
                    np.concatenate([r[1] for r in rows]), pa.int64()
                ),
                "sim": pa.array(
                    np.concatenate([r[2] for r in rows]), pa.float64()
                ),
            }
        )

    df = (
        emb_dataset(sf_dir)
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out_q, out_r, out_v = [], [], []
    for qi, qid in enumerate(qids):
        sub = df[df["qi"] == qi]
        ids = sub["vec_id"].to_numpy()
        sims = sub["sim"].to_numpy()
        order = np.lexsort((ids, -sims))[:k]
        out_q.extend([qid] * len(order))
        out_r.extend(range(1, len(order) + 1))
        out_v.extend(int(x) for x in ids[order])
    return pa.table(
        {
            "qid": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
        }
    )


def knn_filtered_sql_oracle(lang: str = "en") -> str:
    return f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id IN (0, 1, 2)),
        scored AS (
          SELECT q.qid, e.vec_id,
                 list_cosine_similarity(q.qe, e.embedding) AS sim
          FROM q
          CROSS JOIN embeddings e
          JOIN documents d ON d.doc_id = e.vec_id AND d.lang = '{lang}'
        )
        SELECT qid, rank, vec_id FROM (
          SELECT qid, vec_id,
                 CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY sim DESC, vec_id ASC
                 ) AS BIGINT) AS rank
          FROM scored
        ) WHERE rank <= 10
    """


# --------------------------------------- SQL replays + recall-floor rows ----

_EMB_DIM = 64  # the embeddings table's schema constant (TESTDATA.md)


def _hyperplane_literal_rows(nbits: int, dim: int = _EMB_DIM) -> list[str]:
    """The deterministic hyperplanes as SQL DOUBLE-list literals — the
    algorithm PARAMETERS (seeded, data-independent), embedded so DuckDB
    can replay the sign computation."""
    H = _hyperplanes(dim, nbits)
    return [
        "[" + ", ".join(repr(float(x)) for x in row) + "]" for row in H
    ]


def _sign_key_sql(nbits: int) -> str:
    """SQL expression for the nbits-bit hyperplane sign key of
    ``embedding``.  Signs are taken on the RAW vector (normalization is a
    positive scale — identical signs to the engine's unit-vector dots)."""
    rows = _hyperplane_literal_rows(nbits)
    return " + ".join(
        f"(CASE WHEN list_dot_product(embedding, {rows[j]}) > 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(nbits)
    )


def lsh_knn_cosine_sql_oracle(
    query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10, nbits: int = 8
) -> str:
    """FULL SQL replay of the hyperplane-LSH ANN path (not a consistency
    proxy): every vector's sign key is recomputed from the embedded
    hyperplane literals, the engine's multi-probe candidate rule
    (query probes Hamming <= 2 around its base key) becomes
    ``bit_count(xor(qkey, vkey)) <= 2``, and the exact cosine re-rank is
    the same row_number window the exact-kNN oracle uses.  This promotes
    ``lsh_knn_cosine`` from rows-only to hash-checked."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        WITH keyed AS (
          SELECT vec_id, embedding, CAST({_sign_key_sql(nbits)} AS BIGINT) AS key
          FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, embedding AS qe, key AS qkey
              FROM keyed WHERE vec_id IN ({ids})),
        cand AS (
          SELECT q.qid, kk.vec_id,
                 list_cosine_similarity(q.qe, kk.embedding) AS sim
          FROM q JOIN keyed kk ON bit_count(xor(q.qkey, kk.key)) <= 2
        )
        SELECT qid, rank, vec_id FROM (
          SELECT qid, vec_id,
                 CAST(row_number() OVER (PARTITION BY qid
                      ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
          FROM cand
        ) WHERE rank <= {k}
    """


def embedding_neardup_lsh_sql_oracle(
    threshold: float = 0.45, nbits: int = 6
) -> str:
    """FULL SQL replay of the LSH-blocked near-dup join: each vector
    emits base + Hamming-1 probes, so two vectors share a probe bucket
    IFF their sign keys differ by <= 2 bits — exactly
    ``bit_count(xor(ka, kb)) <= 2`` — and every surviving pair is the
    exact-cosine verify.  Promotes ``embedding_neardup_lsh`` from
    rows-only to hash-checked."""
    return f"""
        WITH keyed AS (
          SELECT vec_id, embedding, CAST({_sign_key_sql(nbits)} AS BIGINT) AS key
          FROM embeddings
        )
        SELECT x.vec_id AS a, y.vec_id AS b
        FROM keyed x JOIN keyed y
          ON x.vec_id < y.vec_id
         AND bit_count(xor(x.key, y.key)) <= 2
        WHERE list_cosine_similarity(x.embedding, y.embedding) >= {threshold!r}
        ORDER BY a, b
    """


def _knn_recall_floor(
    sf_dir: str, approx: pa.Table, floor: float,
    query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10,
) -> pa.Table:
    """(qid, floor_met): 1 iff the approximate path's MEAN recall@k
    against the exact kNN is >= floor — the pytest recall floors
    surfaced as a driver-hashable row (the r04 VERDICT ask).  The
    oracle asserts the constant 1 per query id; a recall regression in
    the engine flips the Ray-side value and the hash goes red."""
    exact = knn_cosine(sf_dir, query_ids, k).to_pandas()
    ap = approx.to_pandas()
    qids = sorted(int(q) for q in exact["qid"].unique())
    recalls = []
    for qid in qids:
        e = set(exact[exact["qid"] == qid]["vec_id"])
        a = set(ap[ap["qid"] == qid]["vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    met = int(float(np.mean(recalls)) >= floor) if recalls else 0
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "floor_met": pa.array([met] * len(qids), pa.int64()),
        }
    )


def lsh_knn_recall(sf_dir: str) -> pa.Table:
    """Recall floor 0.2 for the 8-bit hyperplane LSH (weak by design on
    random vectors — the multi-probe radius, not the mechanism, sets it)."""
    return _knn_recall_floor(sf_dir, lsh_knn_cosine(sf_dir), 0.2)


def ivf_knn_recall(sf_dir: str) -> pa.Table:
    """Recall floor 0.6 for IVF at nprobe=4 of 16 lists."""
    return _knn_recall_floor(sf_dir, ivf_knn_cosine(sf_dir), 0.6)


def pq_knn_recall(sf_dir: str) -> pa.Table:
    """Recall floor 0.6 for the PQ scan + exact-refine path."""
    return _knn_recall_floor(sf_dir, pq_knn_cosine(sf_dir), 0.6)


def knn_recall_floor_sql_oracle(query_ids: tuple[int, ...] = (0, 1, 2)) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        SELECT vec_id AS qid, CAST(1 AS BIGINT) AS floor_met
        FROM embeddings WHERE vec_id IN ({ids}) ORDER BY qid
    """
