"""BM25 query engine over stateful shard-searcher actors.

The reference's read path is one mmap'd chunk blob per reader with
``Find(key)`` hash probes (``/root/reference/index.cpp:22-46``,
``index.cpp:9-14``); a multi-chunk query engine and scorer are absent from
the snapshot, so the BM25 contract is pinned by SURVEY.md §2.11:

    score(q,d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))
    idf(t)     = ln((N - df + 0.5)/(df + 0.5) + 1)      (always >= 0)
    k1 = 1.2, b = 0.75; unique query terms; ties broken by ascending docID.

Architecture: one ``SearchShard`` actor per group of build chunks
(document-partitioned, so each shard scores its docID range completely and
returns a local top-k; the driver merge is a pure k-way select, never a
re-sum).  Term -> postings dict, doclen arrays and skip metadata load once
in the actor constructor (the reference's T3 mmap residency,
SURVEY.md §2.3).  Global idf comes from the merged lexicon via a
term-filtered parquet read on the driver — the broadcast-small-side "join"
(SURVEY.md §2.4 J1).

Determinism: terms are processed in ascending term order and postings in
ascending docID order, with np.float64 accumulation — bit-identical to the
brute-force oracle (``oracle.py``), which mirrors the same operation order.

Block-max pruning (``prune=True``): per 128-posting sub-block, an upper
bound ``idf * (k1+1)*max_tf/(max_tf + k1*(1-b))`` (a monotone-in-tf bound
that assumes the shortest possible doc) plus the current partial-score
range-max decides whether the sub-block can affect the final top-k; pruned
sub-blocks are never decoded (their byte ranges are skipped via the
gap-reset skip offsets).  Pruning is score-lossless for the returned top-k
— enforced by tests comparing against ``prune=False`` and the oracle.
"""

from __future__ import annotations

import glob
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray

from ..functions.tokenize import TokenNormalizer, tokenize_batch
from ..stages.pack import unpack_block, unpack_subblocks
from .build import load_stats

K1 = 1.2
B = 0.75


def query_terms(query: str, tokenizer_mode: str) -> list[str]:
    """Unique, ascending-sorted query terms under the index's tokenizer."""
    norm = TokenNormalizer(tokenizer_mode)
    _, tid, vocab = tokenize_batch(pa.array([query]), norm)
    return sorted(set(vocab[t] for t in tid))


class Lexicon:
    """Driver-resident term -> df lookup over the merged lexicon.

    Loads the whole (term, df) mapping once when it fits in
    ``max_resident_bytes`` (the reference's T3 residency for the dict);
    falls back to term-filtered parquet reads for huge vocabularies —
    either way the parquet is opened once, not per search call.
    """

    def __init__(self, index_dir: str, n_docs: int, max_resident_bytes: int = 256 << 20):
        self.n = n_docs
        files = sorted(glob.glob(os.path.join(index_dir, "lexicon", "*.parquet")))
        size = sum(os.path.getsize(f) for f in files)
        self._map: dict[str, int] | None = None
        self._ds = None
        if size <= max_resident_bytes:
            t = pa.concat_tables(pq.read_table(f, columns=["term", "df"]) for f in files)
            self._map = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        else:
            self._ds = pads.dataset(files)

    def idf(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        if not terms:
            return {}
        out: dict[str, tuple[int, float]] = {}
        if self._map is not None:
            pairs = [(t, self._map[t]) for t in terms if t in self._map]
        else:
            t = self._ds.to_table(
                columns=["term", "df"], filter=pads.field("term").isin(terms)
            )
            pairs = list(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        n = self.n
        for term, df in pairs:
            out[term] = (df, math.log((n - df + 0.5) / (df + 0.5) + 1.0))
        return out


def idf_weights(index_dir: str, terms: list[str]) -> dict[str, tuple[int, float]]:
    """term -> (df, idf) from the merged lexicon (one-shot convenience)."""
    stats = load_stats(index_dir)
    return Lexicon(index_dir, stats["N"]).idf(terms)


class _ChunkIndex:
    """In-memory image of one build chunk: term dict + doclens."""

    def __init__(self, chunk_dir: str):
        self.terms: dict[str, list[int]] = {}
        self.block_seq: np.ndarray
        cols = ["term", "block_seq", "df", "cf", "postings", "skips"]
        tables = []
        for f in sorted(glob.glob(os.path.join(chunk_dir, "parts", "*.parquet"))):
            tables.append(pq.read_table(f, columns=cols))
        t = pa.concat_tables(tables) if tables else None
        if t is None or len(t) == 0:
            self.df = np.empty(0, np.int64)
            self._post_offs = np.zeros(1, np.int64)
            self._post_data = np.empty(0, np.uint8)
            self.skip_first: list = []
            self.skip_offset: list = []
            self.skip_maxtf: list = []
        else:
            self.df = t["df"].to_numpy(zero_copy_only=False)
            self.block_seq = t["block_seq"].to_numpy(zero_copy_only=False)
            # postings stay in the Arrow binary buffer — per-block access is
            # an offset slice (zero-copy), never a to_pylist materialization
            col = t["postings"].combine_chunks()
            if col.offset == 0 and col.null_count == 0:
                self._post_offs = np.frombuffer(
                    col.buffers()[1], dtype=np.int32, count=len(col) + 1
                ).astype(np.int64)
                self._post_data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            else:  # sliced/validity edge case: copy once
                raw = b"".join(col.to_pylist())
                lens = pa.compute.binary_length(col).to_numpy(zero_copy_only=False)
                self._post_offs = np.zeros(len(col) + 1, np.int64)
                np.cumsum(lens, out=self._post_offs[1:])
                self._post_data = np.frombuffer(raw, dtype=np.uint8)
            sk = t["skips"].combine_chunks()
            lo = sk.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lo = lo - lo[0]  # flatten() re-bases the child values
            child = sk.flatten()
            fd = child.field("first_doc").to_numpy(zero_copy_only=False)
            so = child.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
            mt = child.field("max_tf").to_numpy(zero_copy_only=False).astype(np.int64)
            nrows = len(t)
            self.skip_first = [fd[lo[i] : lo[i + 1]] for i in range(nrows)]
            self.skip_offset = [so[lo[i] : lo[i + 1]] for i in range(nrows)]
            self.skip_maxtf = [mt[lo[i] : lo[i + 1]] for i in range(nrows)]
            for i, term in enumerate(t["term"].to_pylist()):
                self.terms.setdefault(term, []).append(i)
            # global block order = docID order (salted blocks of one term come
            # from different pack partitions, so block_seq alone is local)
            for rows in self.terms.values():
                rows.sort(key=lambda i: int(self.skip_first[i][0]))

        # doclens indexed by (docID - doc_min)
        dm = []
        for f in sorted(glob.glob(os.path.join(chunk_dir, "docmap", "*.parquet"))):
            dm.append(pq.read_table(f, columns=["docID", "n_tokens"]))
        d = pa.concat_tables(dm)
        ids = d["docID"].to_numpy(zero_copy_only=False)
        toks = d["n_tokens"].to_numpy(zero_copy_only=False)
        self.doc_min = int(ids.min()) if len(ids) else 0
        self.doc_max = int(ids.max()) if len(ids) else -1
        self.doclen = np.zeros(self.doc_max - self.doc_min + 1, dtype=np.float64)
        self.doclen[ids - self.doc_min] = toks

    def posting(self, i: int) -> np.ndarray:
        """Zero-copy view of block i's varint stream."""
        return self._post_data[self._post_offs[i] : self._post_offs[i + 1]]


def _score_chunk(
    ci: _ChunkIndex,
    terms: list[str],
    idfs: np.ndarray,
    k: int,
    avgdl: float,
    prune: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Score one chunk -> (top docIDs, scores), deterministic order."""
    base = ci.doc_min
    scores = np.zeros_like(ci.doclen)
    norm_dl = K1 * (1.0 - B + B * ci.doclen / avgdl)

    # upper bound per term: shortest-doc assumption (dl -> 0 lower-bounds
    # the denominator at tf + k1*(1-b)); monotone in tf => block max valid
    def ub(tf_max: np.ndarray | float, idf: float) -> np.ndarray | float:
        return idf * (K1 + 1.0) * tf_max / (tf_max + K1 * (1.0 - B))

    present = [
        (term, idfs[j], ci.terms[term]) for j, term in enumerate(terms) if term in ci.terms
    ]
    if not present:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    remaining_ub = np.array(
        [
            ub(max(float(ci.skip_maxtf[i].max()) for i in rows), idf)
            for _, idf, rows in present
        ]
    )
    tail_ub = np.concatenate([np.cumsum(remaining_ub[::-1])[::-1], [0.0]])

    tau = -np.inf  # k-th best partial score so far
    for j, (term, idf, rows) in enumerate(present):
        for i in rows:
            df_i = int(ci.df[i])
            if prune and tau > -np.inf:
                # sub-block level: partial-score range-max + this sub-block's
                # UB + all later terms' UBs can't reach tau => skip decode.
                # reduceat segments run to the next sub-block start (last one
                # to chunk end) — conservative, hence sound.
                sfirst = ci.skip_first[i]
                sub_ub = ub(ci.skip_maxtf[i].astype(np.float64), idf)
                pmax = np.maximum.reduceat(scores, sfirst - base)
                keep = (pmax + sub_ub + tail_ub[j + 1]) >= tau
                if not keep.all():
                    docs, tfs = unpack_subblocks(
                        ci.posting(i), df_i, ci.skip_offset[i], np.flatnonzero(keep)
                    )
                else:
                    docs, tfs = unpack_block(ci.posting(i), df_i)
            else:
                docs, tfs = unpack_block(ci.posting(i), df_i)
            if len(docs) == 0:
                continue
            idx = docs - base
            contrib = idf * (tfs * (K1 + 1.0)) / (tfs + norm_dl[idx])
            scores[idx] += contrib  # (term, doc) unique => no collision
        if prune:
            nz = np.flatnonzero(scores)
            if len(nz) >= k:
                tau = np.partition(scores[nz], len(nz) - k)[len(nz) - k]

    nz = np.flatnonzero(scores)
    if len(nz) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    order = np.lexsort((nz, -scores[nz]))[:k]
    top = nz[order]
    return top + base, scores[top]


@ray.remote
class SearchShard:
    """Stateful query actor: loads its chunks once, serves score requests."""

    def __init__(self, chunk_dirs: list[str], avgdl: float):
        self.chunks = [_ChunkIndex(d) for d in chunk_dirs]
        self.avgdl = avgdl

    def ready(self) -> bool:
        return True

    def score_many(
        self, queries: list[tuple[list[str], list[float], int]], prune: bool
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        out = []
        for terms, idfs, k in queries:
            tops, scs = [], []
            for ci in self.chunks:
                t, s = _score_chunk(ci, terms, np.asarray(idfs), k, self.avgdl, prune)
                tops.append(t)
                scs.append(s)
            out.append((np.concatenate(tops), np.concatenate(scs)))
        return out


class BM25Searcher:
    """Driver-side handle: actor pool over the index's chunks."""

    def __init__(self, index_dir: str, num_shards: int | None = None):
        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        chunk_dirs = sorted(glob.glob(os.path.join(index_dir, "chunks", "chunk-*")))
        if not chunk_dirs:
            raise FileNotFoundError(f"no chunks under {index_dir}")
        if num_shards is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_shards = max(1, min(len(chunk_dirs), cpus // 2))
        groups: list[list[str]] = [[] for _ in range(num_shards)]
        for i, d in enumerate(chunk_dirs):
            groups[i % num_shards].append(d)
        self.actors = [
            SearchShard.remote(g, float(self.stats["avgdl"])) for g in groups if g
        ]
        self.lexicon = Lexicon(index_dir, self.stats["N"])
        ray.get([a.ready.remote() for a in self.actors])

    def search(self, query: str, k: int = 10, prune: bool = True) -> pa.Table:
        return self.search_many([(query, k)], prune)[0]

    def search_many(
        self, queries: list[tuple[str, int]], prune: bool = True
    ) -> list[pa.Table]:
        mode = self.stats.get("tokenizer", "code")
        prepared = []
        for q, k in queries:
            terms = query_terms(q, mode)
            weights = self.lexicon.idf(terms)
            terms = [t for t in terms if t in weights]  # absent terms score 0
            idfs = [weights[t][1] for t in terms]
            prepared.append((terms, idfs, k))
        futs = [a.score_many.remote(prepared, prune) for a in self.actors]
        per_actor = ray.get(futs)
        out = []
        for qi, (_, _, k) in enumerate(prepared):
            docs = np.concatenate([pa_res[qi][0] for pa_res in per_actor])
            scores = np.concatenate([pa_res[qi][1] for pa_res in per_actor])
            order = np.lexsort((docs, -scores))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "score": pa.array(scores[order], type=pa.float64()),
                    }
                )
            )
        return out
