"""Record linkage: set-similarity join with PPJoin-style prefix filtering.

``set_similarity_join`` finds all pairs of part records whose NAME token
sets have Jaccard >= t — the entity-resolution primitive (the same shape
matches products across catalogs, merges author lists, links near-same
addresses).  The classic published approach (prefix filtering, as in
PPJoin / the Vernica-Carey-Li MapReduce set-similarity join) beats both
the all-pairs cross join and generic LSH here because it is EXACT and
prunes with a frequency-ordered prefix:

    order the token vocabulary by ascending document frequency (rarest
    first); a record with n distinct tokens only needs its first
    p = n - ceil(t*n) + 1 tokens (by that global order) indexed — any
    partner with Jaccard >= t must share at least one PREFIX token with
    it, because J(A,B) >= t implies |A∩B| >= ceil(t*|A|), and missing
    all p prefix tokens leaves only |A| - p = ceil(t*|A|) - 1 < that.

Distributed shape (three stages, no raw record ever shuffles twice):

1. token DF: per-batch distinct-(record, token) counts -> one tiny
   groupby (vocabulary-sized result, broadcast back as a rank array).
2. prefix index: each record emits only its p prefix-token rows
   (token-rank, id); ``groupby(tok)`` buckets candidates; a vectorized
   triu per bucket yields pairs.  Rare-first ordering makes the hottest
   (most frequent) tokens the ones LEAST emitted — the skew antidote.
3. exact verify: candidate ids' full token-rank sets are re-derived
   behind a broadcast id filter and every candidate pair gets an exact
   integer Jaccard via the run-gather + lexsort kernel shared with
   ``dedup.ngram_jaccard_lsh`` (no driver dict, no per-pair loop).

Every emitted pair is exact (precision 1 by the verify, recall 1 by the
prefix-filter theorem), so the whole output hash-compares against the
quadratic SQL oracle.

Reference parity: the reference engine has no join operators (SURVEY
§2.4 — lookups only); this is a training-data/catalog extension.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..util import pairs_table, stage_fn

_LOG = logging.getLogger(__name__)

MAX_BUCKET = 4096


def _record_token_runs(names: pa.ChunkedArray | pa.Array):
    """(record_idx, token) rows with per-record distinct tokens, from a
    space-separated name column — flattened, fully vectorized."""
    toks = pc.split_pattern(names, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    rec = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # distinct within record: sort (rec, word), drop adjacent dups
    order = np.lexsort((words, rec))
    r_s, w_s = rec[order], words[order]
    if len(r_s):
        keep = np.concatenate([[True], (r_s[1:] != r_s[:-1]) | (w_s[1:] != w_s[:-1])])
        r_s, w_s = r_s[keep], w_s[keep]
    return r_s, w_s


class _TokenDF:
    """batch -> per-token distinct-record count partials."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, w = _record_token_runs(batch["p_name"])
        uniq, cnt = np.unique(w, return_counts=True)
        return pa.table(
            {
                "tok": pa.array(uniq, pa.string()),
                "n_part": pa.array(cnt.astype(np.int64)),
            }
        )


class _PrefixEmit:
    """batch -> (tok_rank, id) rows for each record's PREFIX tokens only."""

    def __init__(self, vocab_ref, threshold_pct: int):
        # sorted token array + its rank (df asc, token asc) — broadcast once
        self.vocab, self.rank = ray.get(vocab_ref)
        self.pct = threshold_pct

    def __call__(self, batch: pa.Table) -> pa.Table:
        rec, words = _record_token_runs(batch["p_name"])
        ranks = self.rank[np.searchsorted(self.vocab, words)]
        ids = batch["p_partkey"].to_numpy(zero_copy_only=False)
        # per-record ranks ascending (rarest-first by construction)
        order = np.lexsort((ranks, rec))
        r_s, k_s = rec[order], ranks[order]
        starts = np.flatnonzero(
            np.concatenate([[True], r_s[1:] != r_s[:-1]])
        )
        sizes = np.diff(np.append(starts, len(r_s)))
        # prefix length p = n - ceil(t*n) + 1
        p = sizes - ((self.pct * sizes + 99) // 100) + 1
        pos = np.arange(len(r_s)) - np.repeat(starts, sizes)
        keep = pos < np.repeat(p, sizes)
        return pa.table(
            {
                "tok": pa.array(k_s[keep], pa.int64()),
                "doc_id": pa.array(ids[r_s[keep]], pa.int64()),
            }
        )


class _CandTokenSets:
    """batch -> (doc_id, packed token-rank set) for candidate ids only —
    the verify side's input, shaped exactly like dedup._CandGramSets."""

    def __init__(self, vocab_ref, cand_ids_ref):
        self.vocab, self.rank = ray.get(vocab_ref)
        self.want = ray.get(cand_ids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["p_partkey"].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, self.want)
        if not mask.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "grams": pa.array([], pa.binary())}
            )
        sub = batch.filter(pa.array(mask))
        rec, words = _record_token_runs(sub["p_name"])
        ranks = self.rank[np.searchsorted(self.vocab, words)].astype(np.uint64)
        sub_ids = sub["p_partkey"].to_numpy(zero_copy_only=False)
        # rec is grouped ascending (lexsorted) — slice contiguous runs;
        # set order is irrelevant to the verify kernel, distinctness holds
        starts = np.flatnonzero(np.concatenate([[True], rec[1:] != rec[:-1]]))
        ends = np.append(starts[1:], len(rec))
        by_rec = {int(rec[s]): ranks[s:e].tobytes() for s, e in zip(starts, ends)}
        sets = [by_rec.get(i, b"") for i in range(len(sub_ids))]
        return pa.table(
            {
                "doc_id": pa.array(sub_ids, pa.int64()),
                "grams": pa.array(sets, pa.binary()),
            }
        )


def set_similarity_join(sf_dir: str, threshold_pct: int = 50) -> pa.Table:
    """All part pairs with name-token Jaccard >= ``threshold_pct``% as
    (a, b, jaccard_pct) — exact, via prefix-filtered candidate generation
    (module docstring has the plan and the pruning theorem)."""
    from .dedup import _PairJaccardVerify

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    # stage 1: global token document frequencies (vocabulary-sized)
    from ray.data.aggregate import Sum

    df = (
        parts.map_batches(stage_fn(_TokenDF), batch_format="pyarrow", batch_size=8192)
        .groupby("tok")
        .aggregate(Sum("n_part", alias_name="df"))
        .to_pandas()
    )
    df = df.sort_values(["df", "tok"]).reset_index(drop=True)
    vocab = df["tok"].to_numpy()
    v_order = np.argsort(vocab)
    vocab_ref = ray.put(
        (vocab[v_order], np.arange(len(vocab), dtype=np.int64)[v_order])
    )

    # stage 2: prefix index -> candidate pairs per token bucket
    def bucket_cands(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        if len(ids) > MAX_BUCKET:
            _LOG.warning(
                "set-similarity bucket with %d members (> %d)", len(ids), MAX_BUCKET
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ii]), "b": pa.array(ids[jj])})

    cand = pairs_table(
        parts.map_batches(
            stage_fn(_PrefixEmit, vocab_ref, threshold_pct),
            batch_format="pyarrow",
            batch_size=8192,
        )
        .groupby("tok")
        .map_groups(bucket_cands, batch_format="pyarrow")
    )
    if cand.num_rows == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard_pct": pa.array([], pa.int64()),
            }
        )

    # stage 3: exact verify over candidate pairs (token sets re-derived
    # for candidates only; object-store blocks, no driver dict)
    cand_ids = np.unique(
        np.concatenate(
            [
                cand["a"].to_numpy(zero_copy_only=False),
                cand["b"].to_numpy(zero_copy_only=False),
            ]
        )
    )
    set_refs = tuple(
        parts.map_batches(
            stage_fn(_CandTokenSets, vocab_ref, ray.put(cand_ids)),
            batch_format="pyarrow",
            batch_size=8192,
        ).to_arrow_refs()
    )
    return pairs_table(
        ray.data.from_arrow(cand).map_batches(
            stage_fn(_PairJaccardVerify, set_refs, threshold_pct),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        extra_cols=("jaccard_pct",),
    )


def set_similarity_join_sql_oracle(threshold_pct: int = 50) -> str:
    # quadratic by design: the oracle is the exactness BASELINE the
    # prefix-filtered engine must reproduce (same split as
    # ngram_jaccard_dedup); fine at driver scale, never the scale path
    return f"""
        WITH tok AS (
          SELECT p_partkey,
                 list_distinct(regexp_split_to_array(p_name, ' ')) AS toks
          FROM part
        ),
        pairs AS (
          SELECT a.p_partkey AS a, b.p_partkey AS b,
                 CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS i,
                 CAST(len(a.toks) + len(b.toks)
                      - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS u
          FROM tok a JOIN tok b ON a.p_partkey < b.p_partkey
        )
        SELECT a, b, (100 * i) // u AS jaccard_pct
        FROM pairs WHERE 100 * i >= {threshold_pct} * u
        ORDER BY a, b
    """


def linkage_clusters(sf_dir: str, threshold_pct: int = 50) -> pa.Table:
    """End-to-end entity resolution: the prefix-filtered similarity join's
    pairs become edges, connected components assign every part a cluster
    (the minimum p_partkey reachable through >= threshold matches), and
    parts with no match are singleton clusters of themselves.

    (p_partkey, cluster).  Tiered exactly like ``graph.connected_
    components``: below ``CC_DRIVER_MAX_PAIRS`` the vectorized in-memory
    min-label propagation wins outright; above it the alternating
    large-star/small-star rounds run as bucket shuffles
    (``dedup.cc_clusters``).  The oracle recomputes the transitive
    closure with a recursive CTE — a component's minimum id must agree
    edge-for-edge with the distributed propagation."""
    from .dedup import CC_DRIVER_MAX_PAIRS, cc_clusters, min_label_propagation

    pairs = set_similarity_join(sf_dir, threshold_pct)
    ids = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    ).to_pandas()["p_partkey"].to_numpy()
    a = pairs["a"].to_numpy(zero_copy_only=False)
    b = pairs["b"].to_numpy(zero_copy_only=False)
    if len(a) > CC_DRIVER_MAX_PAIRS:
        labeled = (
            cc_clusters(ray.data.from_arrow(pairs.select(["a", "b"])))
            .to_pandas()
        )
        members = labeled["doc_id"].to_numpy()
        rep = labeled["cluster_rep"].to_numpy()
    else:
        members, rep = min_label_propagation(a, b)
    import pandas as pd

    lab = dict(zip(members.tolist(), rep.tolist()))
    out = pd.DataFrame(
        {
            "p_partkey": np.sort(ids),
            "cluster": [lab.get(int(i), int(i)) for i in np.sort(ids)],
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema([("p_partkey", pa.int64()), ("cluster", pa.int64())])
    )


def linkage_clusters_sql_oracle(threshold_pct: int = 50) -> str:
    # transitive closure by recursive label spread: a node's cluster is the
    # minimum id among everything reachable through the (symmetric) edge
    # set; (node, label) state is bounded by sum(component size^2)
    return f"""
        WITH RECURSIVE
        tok AS (
          SELECT p_partkey,
                 list_distinct(regexp_split_to_array(p_name, ' ')) AS toks
          FROM part
        ),
        pairs AS (
          SELECT a.p_partkey AS a, b.p_partkey AS b
          FROM tok a JOIN tok b ON a.p_partkey < b.p_partkey
          WHERE 100 * len(list_intersect(a.toks, b.toks)) >=
                {threshold_pct} * (len(a.toks) + len(b.toks)
                                   - len(list_intersect(a.toks, b.toks)))
        ),
        e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        r AS (
          SELECT p_partkey AS node, p_partkey AS label FROM part
          UNION
          SELECT e.b AS node, r.label FROM r JOIN e ON e.a = r.node
        )
        SELECT node AS p_partkey, CAST(min(label) AS BIGINT) AS cluster
        FROM r GROUP BY node
    """


# ------------------------------------------ weighted (tf-idf) cosine join ----


class _MaxNormW:
    """batch -> per-term MAX normalized tf-idf weight partials (ord, maxw)
    — the global per-term bound the AllPairs prefix filter needs."""

    def __init__(self, vocab_ref):
        self.terms, self.idf, self.ord = ray.get(vocab_ref)

    def _doc_vectors(self, batch: pa.Table):
        """(doc_row, ord, w, norm_per_row) for every (doc, term) pair."""
        from ..functions.tokenize import TokenNormalizer, tokenize_batch

        docc, tid, vocab = tokenize_batch(
            batch["text"], TokenNormalizer("simple")
        )
        if len(docc) == 0:
            z = np.empty(0, np.int64)
            return z, z, np.empty(0, np.float64), np.empty(0, np.float64)
        nv = max(len(vocab), 1)
        key = docc.astype(np.int64) * nv + tid
        uniq, inv, tf = np.unique(key, return_inverse=True, return_counts=True)
        d = uniq // nv
        t_loc = uniq % nv
        g = np.searchsorted(self.terms, np.asarray(vocab))[t_loc]
        w = tf.astype(np.float64) * self.idf[g]
        norm2 = np.bincount(d, weights=w * w)
        norm = np.sqrt(norm2)[d]
        return d, self.ord[g], w, norm

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, o, w, norm = self._doc_vectors(batch)
        if len(d) == 0:
            return pa.table(
                {"ord": pa.array([], pa.int64()), "maxw": pa.array([], pa.float64())}
            )
        nw = w / norm
        # per-ord max partial
        order = np.argsort(o)
        o_s, nw_s = o[order], nw[order]
        starts = np.flatnonzero(np.concatenate([[True], o_s[1:] != o_s[:-1]]))
        return pa.table(
            {
                "ord": pa.array(o_s[starts], pa.int64()),
                "maxw": pa.array(np.maximum.reduceat(nw_s, starts)),
            }
        )


def prefix_emit_mask(
    d_s: np.ndarray, contrib: np.ndarray, t: float
) -> np.ndarray:
    """The AllPairs suffix-bound emit rule, as a pure kernel (property-
    tested in isolation): rows are (doc, term) pairs sorted by
    (doc, global term order) with ``contrib = nw * maxw`` per row; row i
    is emitted iff the suffix sum of contrib within its doc run >= t."""
    if len(d_s) == 0:
        return np.zeros(0, dtype=bool)
    starts = np.flatnonzero(np.concatenate([[True], d_s[1:] != d_s[:-1]]))
    sizes = np.diff(np.append(starts, len(d_s)))
    gid = np.repeat(np.arange(len(starts)), sizes)
    csum = np.cumsum(contrib)
    excl = csum - contrib  # exclusive prefix sum
    doc_tot = csum[starts + sizes - 1] - (excl[starts])
    suffix = doc_tot[gid] - (excl - excl[starts][gid])
    return suffix >= t


class _CosPrefixEmit(_MaxNormW):
    """batch -> (tok=ord, doc_id) rows for each doc's PREFIX under the
    AllPairs suffix bound: in a fixed global term order, a doc emits term
    position i iff sum_{j>=i} nw_d(t_j) * maxw(t_j) >= t.  Soundness (for
    ANY fixed order): let t* be a qualifying pair's shared term of
    minimal order; if either side did not emit t*, that side's suffix
    bound at t* already upper-bounds the whole cosine below t."""

    def __init__(self, full_ref, threshold_pct: int):
        self.terms, self.idf, self.ord, maxw_by_ord = ray.get(full_ref)
        self.maxw = maxw_by_ord
        self.t = threshold_pct / 100.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, o, w, norm = self._doc_vectors(batch)
        if len(d) == 0:
            return pa.table(
                {"tok": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        nw = w / norm
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d))
        d_s, o_s, nw_s = d[order], o[order], nw[order]
        keep = prefix_emit_mask(d_s, nw_s * self.maxw[o_s], self.t)
        return pa.table(
            {
                "tok": pa.array(o_s[keep], pa.int64()),
                "doc_id": pa.array(ids[d_s[keep]], pa.int64()),
            }
        )


class _CandVectors(_MaxNormW):
    """batch -> (doc_id, ords blob, weights blob, norm) for candidate ids
    only — the verify side's input (the _CandGramSets shape, weighted)."""

    def __init__(self, vocab_ref, cand_ids_ref):
        super().__init__(vocab_ref)
        self.want = ray.get(cand_ids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, self.want)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "ords": pa.array([], pa.binary()),
                "ws": pa.array([], pa.binary()),
                "norm": pa.array([], pa.float64()),
            }
        )
        if not mask.any():
            return empty
        sub = batch.filter(pa.array(mask))
        d, o, w, norm = self._doc_vectors(sub)
        if len(d) == 0:
            return empty
        sub_ids = sub["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d))
        d_s, o_s, w_s = d[order], o[order], w[order]
        starts = np.flatnonzero(np.concatenate([[True], d_s[1:] != d_s[:-1]]))
        ends = np.append(starts[1:], len(d_s))
        rows_d, ords_b, ws_b, norms = [], [], [], []
        for s, e in zip(starts, ends):
            rows_d.append(int(sub_ids[d_s[s]]))
            ords_b.append(o_s[s:e].astype(np.uint64).tobytes())
            ws_b.append(w_s[s:e].tobytes())
            norms.append(float(np.sqrt(np.sum(w_s[s:e] ** 2))))
        return pa.table(
            {
                "doc_id": pa.array(rows_d, pa.int64()),
                "ords": pa.array(ords_b, pa.binary()),
                "ws": pa.array(ws_b, pa.binary()),
                "norm": pa.array(norms, pa.float64()),
            }
        )


class _PairCosVerify:
    """Exact tf-idf cosine over candidate-pair partitions, fully
    vectorized (the _PairJaccardVerify kernel with weighted products):
    run-gather both sides' (ord, w) runs tagged with the pair index, one
    lexsort, adjacent (pair, ord) duplicates multiply into dot-product
    contributions, one weighted bincount."""

    def __init__(self, vec_refs, threshold_pct: int):
        t = pa.concat_tables(ray.get(list(vec_refs)))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        self.ids = ids[order]
        o_blobs = [t["ords"][int(i)].as_py() for i in order]
        w_blobs = [t["ws"][int(i)].as_py() for i in order]
        self.sizes = np.array([len(x) // 8 for x in o_blobs], dtype=np.int64)
        self.flat_o = np.frombuffer(b"".join(o_blobs), dtype=np.uint64)
        self.flat_w = np.frombuffer(b"".join(w_blobs), dtype=np.float64)
        self.starts = np.concatenate([[0], np.cumsum(self.sizes)[:-1]]).astype(np.int64)
        self.norms = t["norm"].to_numpy(zero_copy_only=False)[order]
        self.t = threshold_pct / 100.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _run_gather

        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(self.ids, a)
        ib = np.searchsorted(self.ids, b)
        la, lb = self.sizes[ia], self.sizes[ib]
        ords = np.concatenate(
            [
                _run_gather(self.flat_o, self.starts[ia], la),
                _run_gather(self.flat_o, self.starts[ib], lb),
            ]
        )
        ws = np.concatenate(
            [
                _run_gather(self.flat_w, self.starts[ia], la),
                _run_gather(self.flat_w, self.starts[ib], lb),
            ]
        )
        pair_idx = np.concatenate(
            [
                np.repeat(np.arange(len(a), dtype=np.int64), la),
                np.repeat(np.arange(len(b), dtype=np.int64), lb),
            ]
        )
        order = np.lexsort((ords, pair_idx))
        os_, ps, ws_ = ords[order], pair_idx[order], ws[order]
        dup = (os_[1:] == os_[:-1]) & (ps[1:] == ps[:-1])
        prod = ws_[1:][dup] * ws_[:-1][dup]
        dot = np.bincount(ps[1:][dup], weights=prod, minlength=len(a))
        na, nb = self.norms[ia], self.norms[ib]
        keep = dot >= self.t * na * nb
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cos_sim": pa.array(dot[keep] / (na[keep] * nb[keep])),
            }
        )


def cosine_similarity_join(
    sf_dir: str, threshold_pct: int = 90
) -> pa.Table:
    """All document pairs whose TF-IDF vectors have cosine >=
    ``threshold_pct``% — the WEIGHTED companion of
    :func:`set_similarity_join` (the AllPairs family, Bayardo et al.
    WWW'07): w(d,t) = tf * ln(1 + N/df), exact cosine, (a, b, cos_sim).

    Distributed shape (mirrors the set join; no raw text shuffles twice):

    1. vocabulary stats: the existing ``term_stats`` pipeline gives
       (term, df); idf and a global df-ascending term order broadcast
       once.  (Vocabulary-sized driver state — Zipf-collapsed, same
       documented bound as ``lm_score``; a ``top_v``-style cap is the
       10^12-doc escape hatch.)
    2. per-term max normalized weight (one more vocabulary-sized
       reduce) — the AllPairs bound table.
    3. prefix emit: each doc emits only term positions whose SUFFIX
       bound sum(nw * maxw) still reaches the threshold (docstring of
       ``_CosPrefixEmit`` has the soundness argument) -> groupby(term)
       candidate buckets -> vectorized triu pairs.  On Zipf text the
       rare-first order makes hot terms land in the skipped suffix; on
       this synthetic near-uniform corpus the filter prunes little —
       the mechanism, not the constant, is the scale path.
    4. exact verify: candidates' full weighted vectors re-derived behind
       a broadcast id filter; one lexsort + weighted bincount per pair
       batch computes the exact dot products (no driver dict, no
       per-pair loop).  The threshold test is ``dot >= t * ||a|| ||b||``
       — the same algebraic FORM the SQL oracle uses, so a disagreement
       would require the two sides' float sums (which differ only in
       summation order, ~1 ulp) to straddle the threshold — possible in
       principle for a pair engineered onto the boundary, never for
       generic data; no systematic formula mismatch exists.

    Precision 1 by the verify, recall 1 by the prefix theorem: the
    output hash-compares against the quadratic SQL oracle.
    """
    from ray.data.aggregate import Max

    from .text import docs_dataset, term_stats

    ts = term_stats(sf_dir, "simple").to_pandas()
    if len(ts) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
    n_docs = docs_dataset(sf_dir, ["doc_id"]).count()
    ts = ts.sort_values(["df", "term"]).reset_index(drop=True)
    ords = np.arange(len(ts), dtype=np.int64)
    t_order = np.argsort(ts["term"].to_numpy())
    terms_sorted = ts["term"].to_numpy()[t_order]
    idf_sorted = np.log(
        1.0 + n_docs / ts["df"].to_numpy().astype(np.float64)
    )[t_order]
    ord_sorted = ords[t_order]
    vocab_ref = ray.put((terms_sorted, idf_sorted, ord_sorted))

    maxw_pd = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_MaxNormW, vocab_ref), batch_format="pyarrow", batch_size=256
        )
        .groupby("ord")
        .aggregate(Max("maxw", alias_name="maxw"))
        .to_pandas()
    )
    maxw_by_ord = np.zeros(len(ts), dtype=np.float64)
    maxw_by_ord[maxw_pd["ord"].to_numpy()] = maxw_pd["maxw"].to_numpy()
    full_ref = ray.put((terms_sorted, idf_sorted, ord_sorted, maxw_by_ord))

    def bucket_cands(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ii]), "b": pa.array(ids[jj])})

    cand = pairs_table(
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_CosPrefixEmit, full_ref, threshold_pct),
            batch_format="pyarrow",
            batch_size=256,
        )
        .groupby("tok")
        .map_groups(bucket_cands, batch_format="pyarrow")
    )
    if cand.num_rows == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
    cand_ids = np.unique(
        np.concatenate(
            [
                cand["a"].to_numpy(zero_copy_only=False),
                cand["b"].to_numpy(zero_copy_only=False),
            ]
        )
    )
    vec_refs = tuple(
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_CandVectors, vocab_ref, ray.put(cand_ids)),
            batch_format="pyarrow",
            batch_size=256,
        )
        .to_arrow_refs()
    )
    out = pairs_table(
        ray.data.from_arrow(cand).map_batches(
            stage_fn(_PairCosVerify, vec_refs, threshold_pct),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        extra_cols=("cos_sim",),
    )
    return out


def cosine_similarity_join_sql_oracle(threshold_pct: int = 90) -> str:
    # quadratic exactness baseline (same split as set_similarity_join);
    # threshold as dot >= t * na * nb — the engine uses the identical
    # algebraic form, so float boundary behavior matches
    t = threshold_pct / 100.0
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text),
                 '[^a-z0-9]+')) AS term
          FROM documents
        ),
        t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        w AS (
          SELECT tf.doc_id, tf.term,
                 tf.tf * ln(1 + n.n * 1.0 / df.df) AS w
          FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
        dot AS (
          SELECT x.doc_id AS a, y.doc_id AS b, sum(x.w * y.w) AS dot
          FROM w x JOIN w y ON x.term = y.term AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        )
        SELECT a, b, dot / (na.nrm * nb.nrm) AS cos_sim
        FROM dot
        JOIN nrm na ON na.doc_id = a
        JOIN nrm nb ON nb.doc_id = b
        WHERE dot >= {t!r} * na.nrm * nb.nrm
        ORDER BY a, b
    """
