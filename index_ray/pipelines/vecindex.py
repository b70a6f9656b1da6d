"""Persisted IVF vector index: build/save/load lifecycle for ANN search.

The inverted-text index has a durable on-disk artifact (chunks + lexicon +
stats.json); this module gives the embedding side the same shape:

``build_vector_index`` trains the spherical-k-means coarse quantizer
(``similarity.kmeans_fit`` — per-batch partials, centroids broadcast),
assigns every vector to its nearest-centroid inverted list inline, and
writes the lists as hive-partitioned parquet (``lists/cid=K/``) plus
``centroids.parquet`` and a ``vstats.json`` manifest.  The partitioned
layout IS the index: a query that probes ``nprobe`` lists reads ONLY those
directories — at 100 TB the unprobed partitions never leave storage.

``VectorIndex`` loads the (tiny) centroid matrix once and serves cosine
top-k: per probed list one remote task reads that partition, scores
against the broadcast query matrix, and returns its top-k; the driver
merges (#queries × #probed-lists × k) candidate rows.

With ``nprobe == n_centroids`` the probe is exhaustive and the result is
EXACTLY brute-force cosine (the lists partition the corpus; every vector
is scored once) — which is how the driver oracle pins this path with the
same SQL as ``knn_cosine``.  Approximate recall at small nprobe is
measured in pytest.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data

from .similarity import _to_matrix, emb_dataset, kmeans_fit


def build_vector_index(
    sf_dir: str,
    out_dir: str,
    n_centroids: int = 16,
    iters: int = 5,
) -> str:
    """Train the quantizer and write the partitioned IVF layout; resumable
    (skips when a matching vstats.json manifest already exists)."""
    man_path = os.path.join(out_dir, "vstats.json")
    fp = f"{n_centroids}:{iters}:{os.path.abspath(sf_dir)}"
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("fingerprint") == fp:
            return out_dir
    cents = kmeans_fit(sf_dir, n_centroids, iters)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "cid": pa.array(np.arange(len(cents)), pa.int32()),
                "centroid": pa.array(list(cents), pa.list_(pa.float64())),
            }
        ),
        os.path.join(out_dir, "centroids.parquet"),
    )
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _to_matrix(batch["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        cid = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("cid", pa.array(cid, pa.int32()))

    emb_dataset(sf_dir).map_batches(
        assign, batch_format="pyarrow", batch_size=4096
    ).write_parquet(os.path.join(out_dir, "lists"), partition_cols=["cid"])
    n = int(
        pads.dataset(
            os.path.join(out_dir, "lists"), partitioning="hive"
        ).count_rows()
    )
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "fingerprint": fp,
                "n_vectors": n,
                "n_centroids": int(n_centroids),
                "dim": int(cents.shape[1]),
            },
            f,
        )
    os.replace(tmp, man_path)  # atomic commit, same as the text index
    return out_dir


@ray.remote
def _score_list(
    list_dir: str, qm: np.ndarray, qis: list[int], k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Score ONE inverted list against the query rows probing it; return
    per-query top-k (qi, vec_id, sim) candidate triples.  ``qm`` is passed
    as an ObjectRef (ray.put once) and auto-dereferenced per task."""
    t = pads.dataset(list_dir).to_table(columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = _to_matrix(t["embedding"])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = qm[qis] @ m.T
    out_q, out_v, out_s = [], [], []
    for row, qi in enumerate(qis):
        s = sims[row]
        idx = np.lexsort((ids, -s))[: min(k, len(ids))]
        out_q.append(np.full(len(idx), qi, dtype=np.int32))
        out_v.append(ids[idx])
        out_s.append(s[idx])
    return (
        np.concatenate(out_q),
        np.concatenate(out_v),
        np.concatenate(out_s),
    )


class VectorIndex:
    """Loaded persisted IVF index: tiny centroid matrix resident on the
    driver; list partitions are read remotely ONLY when probed."""

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, "vstats.json")) as f:
            self.stats = json.load(f)
        t = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        order = np.argsort(t["cid"].to_numpy(zero_copy_only=False))
        self.cents = _to_matrix(t["centroid"])[order]
        self.index_dir = index_dir
        self._list_dirs = {
            int(os.path.basename(d).split("=")[1]): d
            for d in glob.glob(os.path.join(index_dir, "lists", "cid=*"))
        }

    def search_many(
        self, q: np.ndarray, k: int = 10, nprobe: int = 4
    ) -> list[pa.Table]:
        """Cosine top-k per query row of ``q``; ``nprobe >= n_centroids``
        is the exhaustive (exact) path."""
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        nprobe = min(nprobe, len(self.cents))
        probes = np.argsort(-(qn @ self.cents.T), axis=1)[:, :nprobe]
        by_list: dict[int, list[int]] = {}
        for qi in range(len(qn)):
            for cid in probes[qi]:
                by_list.setdefault(int(cid), []).append(qi)
        q_ref = ray.put(qn)
        futs = [
            _score_list.remote(self._list_dirs[cid], q_ref, qis, k)
            for cid, qis in sorted(by_list.items())
            if cid in self._list_dirs  # empty lists write no partition
        ]
        parts = ray.get(futs)
        out = []
        for qi in range(len(qn)):
            docs = np.concatenate(
                [v[p[0] == qi] for p, v in ((x, x[1]) for x in parts)]
            ) if parts else np.empty(0, np.int64)
            sims = np.concatenate(
                [s[p[0] == qi] for p, s in ((x, x[2]) for x in parts)]
            ) if parts else np.empty(0, np.float64)
            order = np.lexsort((docs, -sims))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "vec_id": pa.array(docs[order], pa.int64()),
                        "sim": pa.array(sims[order], pa.float64()),
                    }
                )
            )
        return out


def _index_dir_for(sf_dir: str) -> str:
    import hashlib

    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/index_ray_vec_{key}"


def vector_index_topk(
    sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 10
) -> pa.Table:
    """Driver entry: build (or resume) the persisted IVF index, load it,
    and run the fixture queries EXHAUSTIVELY (nprobe = n_centroids) so the
    result is exact and the oracle is the same cosine SQL as
    ``knn_cosine`` — this row pins the whole persist/load/probe path."""
    from .similarity import _query_matrix

    out = build_vector_index(sf_dir, _index_dir_for(sf_dir))
    vi = VectorIndex(out)
    q, qids = _query_matrix(sf_dir, list(query_ids))
    res = vi.search_many(q, k=k, nprobe=len(vi.cents))
    tables = []
    for qid, r in zip(qids, res):
        tables.append(
            pa.table(
                {
                    "qid": pa.array(np.full(len(r), qid, dtype=np.int64)),
                    "rank": r["rank"],
                    "vec_id": r["vec_id"],
                }
            )
        )
    return pa.concat_tables(tables)
