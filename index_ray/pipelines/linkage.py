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
   (token-rank, id); a tok-keyed shuffle buckets candidates and each
   bucket emits bounded TILE DESCRIPTORS (``_tiles_by_tok``) expanded to
   pairs in small batches — a hot token the filter fails to prune never
   puts O(g^2) rows in one worker heap.  Rare-first ordering makes the
   hottest (most frequent) tokens the ones LEAST emitted — the skew
   antidote.
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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..util import pairs_table, stage_fn


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


class _TokenSets:
    """batch -> (doc_id, packed token-rank set) for every record — the
    verify side's input, shaped like dedup._CandGramSets (no candidate
    filter: the table is then hash-partitioned for the tile verify, so
    no candidate-id set ever folds to the driver)."""

    def __init__(self, vocab_ref):
        self.vocab, self.rank = ray.get(vocab_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rec, words = _record_token_runs(batch["p_name"])
        ranks = self.rank[np.searchsorted(self.vocab, words)].astype(np.uint64)
        ids = batch["p_partkey"].to_numpy(zero_copy_only=False)
        # rec is grouped ascending (lexsorted) — slice contiguous runs;
        # set order is irrelevant to the verify kernel, distinctness holds
        starts = np.flatnonzero(np.concatenate([[True], rec[1:] != rec[:-1]]))
        ends = np.append(starts[1:], len(rec))
        by_rec = {int(rec[s]): ranks[s:e].tobytes() for s, e in zip(starts, ends)}
        sets = [by_rec.get(i, b"") for i in range(len(ids))]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "grams": pa.array(sets, pa.binary()),
            }
        )


def _gram_lookup(tbl: pa.Table):
    """A (doc_id, grams) partition -> (sorted ids, sizes, starts, flat)
    for the run-gather Jaccard kernel."""
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    blobs = [tbl["grams"][int(i)].as_py() for i in order]
    sizes = np.array([len(x) // 8 for x in blobs], dtype=np.int64)
    flat = np.frombuffer(b"".join(blobs), dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    return ids[order], sizes, starts, flat


def _verify_jaccard_tiles(
    t: pa.Table, parts_refs: tuple, threshold_pct: int
) -> pa.Table:
    """Blocked tile verify for the set join (the cosine join's
    ``_verify_tiles_bucket`` with the integer-Jaccard kernel): in-bucket
    dedup and tile grouping share one lexsort; each tile pulls only its
    two token-set partitions."""
    import ray

    from .dedup import _run_gather

    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "jaccard_pct": pa.array([], pa.int64()),
        }
    )
    grouped = dedup_tile_groups(t)
    if grouped is None:
        return empty
    a, b, pb_a, pb_b, starts, ends = grouped
    cache: dict = {}
    out_a, out_b, out_j = [], [], []
    for s, e in zip(starts, ends):
        pia, pib = int(pb_a[s]), int(pb_b[s])
        for p in (pia, pib):
            if p not in cache:
                cache[p] = _gram_lookup(ray.get(parts_refs[p]))
        ids_a, sz_a, st_a, fl_a = cache[pia]
        ids_b, sz_b, st_b, fl_b = cache[pib]
        ia = np.searchsorted(ids_a, a[s:e])
        ib = np.searchsorted(ids_b, b[s:e])
        la, lb = sz_a[ia], sz_b[ib]
        grams = np.concatenate(
            [_run_gather(fl_a, st_a[ia], la), _run_gather(fl_b, st_b[ib], lb)]
        )
        n = e - s
        pair_idx = np.concatenate(
            [
                np.repeat(np.arange(n, dtype=np.int64), la),
                np.repeat(np.arange(n, dtype=np.int64), lb),
            ]
        )
        o2 = np.lexsort((grams, pair_idx))
        gs, ps = grams[o2], pair_idx[o2]
        dup = (gs[1:] == gs[:-1]) & (ps[1:] == ps[:-1])
        inter = np.bincount(ps[1:][dup], minlength=n).astype(np.int64)
        union = la + lb - inter
        keep2 = (union > 0) & (100 * inter >= threshold_pct * union)
        out_a.append(a[s:e][keep2])
        out_b.append(b[s:e][keep2])
        out_j.append((100 * inter[keep2]) // union[keep2])
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "jaccard_pct": pa.array(np.concatenate(out_j), pa.int64()),
        }
    )


def set_similarity_join(sf_dir: str, threshold_pct: int = 50) -> pa.Table:
    """All part pairs with name-token Jaccard >= ``threshold_pct``% as
    (a, b, jaccard_pct) — exact, via prefix-filtered candidate generation
    (module docstring has the plan and the pruning theorem).  The verify
    is the blocked tile shuffle (the candidate pair stream never folds to
    the driver; token-set partitions move once per occupied tile)."""
    import functools

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    # stage 1: global token document frequencies (vocabulary-sized —
    # part-NAME tokens, tiny by construction; the cosine join shows the
    # fully-distributed rank assignment for unbounded vocabularies)
    from ray.data.aggregate import Sum

    df = (
        parts.map_batches(stage_fn(_TokenDF), batch_format="pyarrow", batch_size=8192)
        .groupby("tok")
        .aggregate(Sum("n_part", alias_name="df"))
        .to_pandas()
    )
    if len(df) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "jaccard_pct": pa.array([], pa.int64()),
            }
        )
    df = df.sort_values(["df", "tok"]).reset_index(drop=True)
    vocab = df["tok"].to_numpy()
    v_order = np.argsort(vocab)
    vocab_ref = ray.put(
        (vocab[v_order], np.arange(len(vocab), dtype=np.int64)[v_order])
    )

    # stage 2: prefix index -> candidate pairs per token bucket, emitted
    # as bounded TILE DESCRIPTORS (``_tiles_by_tok``) and expanded in
    # small batches — a hot token the prefix filter fails to prune can
    # no longer put O(g^2) rows in one worker heap (r04 ADVICE finding)
    from ..util import hash_groupby, hash_partition_refs

    cand = hash_groupby(
        parts.map_batches(
            stage_fn(_PrefixEmit, vocab_ref, threshold_pct),
            batch_format="pyarrow",
            batch_size=8192,
        ),
        keys=["tok"],
        finalize=_tiles_by_tok,
    ).map_batches(_expand_tiles, batch_format="pyarrow", batch_size=4)

    # stage 3: blocked tile verify — token sets hash-partitioned once as
    # ObjectRefs; the pair stream shuffles ONCE on its tile key with
    # in-bucket global dedup (see _verify_tiles_bucket's contract)
    n_parts = _VERIFY_PARTS
    sets_ds = parts.map_batches(
        stage_fn(_TokenSets, vocab_ref), batch_format="pyarrow", batch_size=8192
    ).materialize()
    parts_refs = hash_partition_refs(sets_ds, ["doc_id"], n_parts)
    out = hash_groupby(
        cand.map_batches(
            functools.partial(_tag_pair_tiles, n_parts=n_parts),
            batch_format="pyarrow",
        ),
        keys=["pb_a", "pb_b"],
        finalize=functools.partial(
            _verify_jaccard_tiles,
            parts_refs=parts_refs,
            threshold_pct=threshold_pct,
        ),
        num_partitions=64,
    )
    return pairs_table(out, extra_cols=("jaccard_pct",))


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


class _DocTermRows:
    """batch -> (doc_id, term, tf) rows — the map side of the term join."""

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        from ..functions.tokenize import TokenNormalizer

        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import doc_term_tf

        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        if len(d) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[d], pa.int64()),
                "term": pa.array(np.asarray(vocab, dtype=object)[tid], pa.string()),
                "tf": pa.array(tf, pa.int64()),
            }
        )


_EMPTY_VECTORS = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "ords": pa.array([], pa.binary()),
        "ws": pa.array([], pa.binary()),
        "norm": pa.array([], pa.float64()),
    }
)


def _assemble_vectors(t: pa.Table) -> pa.Table:
    """One doc-keyed bucket of (doc_id, ord, tf, idf) rows -> per-doc
    packed vectors (doc_id, ords blob, ws blob, norm), ords ascending.
    The norm sums w^2 in ord order — deterministic at any parallelism."""
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return _EMPTY_VECTORS
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    o = t["ord"].to_numpy(zero_copy_only=False)
    w = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64) * t[
        "idf"
    ].to_numpy(zero_copy_only=False)
    order = np.lexsort((o, d))
    d_s, o_s, w_s = d[order], o[order], w[order]
    starts = np.flatnonzero(np.concatenate([[True], d_s[1:] != d_s[:-1]]))
    ends = np.append(starts[1:], len(d_s))
    norms = np.sqrt(np.add.reduceat(w_s * w_s, starts))
    return pa.table(
        {
            "doc_id": pa.array(d_s[starts], pa.int64()),
            "ords": pa.array(
                [o_s[s:e].astype(np.uint64).tobytes() for s, e in zip(starts, ends)],
                pa.binary(),
            ),
            "ws": pa.array(
                [w_s[s:e].tobytes() for s, e in zip(starts, ends)], pa.binary()
            ),
            "norm": pa.array(norms, pa.float64()),
        }
    )


def _explode_nw(t: pa.Table) -> pa.Table:
    """Packed vectors -> (doc_id, ord, nw) rows (nw = w / ||doc||)."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "ord": pa.array([], pa.int64()),
            "nw": pa.array([], pa.float64()),
        }
    )
    if t.num_rows == 0 or "ords" not in t.column_names:
        return empty
    blobs_o = t["ords"].to_pylist()
    sizes = np.array([len(x) // 8 for x in blobs_o], dtype=np.int64)
    if sizes.sum() == 0:
        return empty
    flat_o = np.frombuffer(b"".join(blobs_o), dtype=np.uint64).astype(np.int64)
    flat_w = np.frombuffer(b"".join(t["ws"].to_pylist()), dtype=np.float64)
    d_rep = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), sizes)
    n_rep = np.repeat(t["norm"].to_numpy(zero_copy_only=False), sizes)
    return pa.table(
        {
            "doc_id": pa.array(d_rep, pa.int64()),
            "ord": pa.array(flat_o, pa.int64()),
            "nw": pa.array(flat_w / n_rep, pa.float64()),
        }
    )


def _max_by_ord(t: pa.Table, val_col: str) -> pa.Table:
    """(ord, val) rows -> per-ord maxima.  Used twice: as the per-batch
    COMBINER over the exploded vectors (val_col='nw', so the ord-keyed
    exchange is vocabulary-collapsed) and as the shuffle FINALIZE over
    the partials (val_col='maxw' — max of maxes is exact)."""
    empty = pa.table(
        {"ord": pa.array([], pa.int64()), "maxw": pa.array([], pa.float64())}
    )
    if t.num_rows == 0 or "ord" not in t.column_names:
        return empty
    o = t["ord"].to_numpy(zero_copy_only=False)
    v = t[val_col].to_numpy(zero_copy_only=False)
    order = np.argsort(o)
    o_s, v_s = o[order], v[order]
    starts = np.flatnonzero(np.concatenate([[True], o_s[1:] != o_s[:-1]]))
    return pa.table(
        {
            "ord": pa.array(o_s[starts], pa.int64()),
            "maxw": pa.array(np.maximum.reduceat(v_s, starts), pa.float64()),
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


def _prefix_emit_bucket(t: pa.Table, threshold: float) -> pa.Table:
    """One doc-keyed bucket of (doc_id, ord, nw, maxw) rows -> the doc's
    PREFIX positions (tok=ord, doc_id) under the AllPairs suffix bound:
    in the fixed global term order, a doc emits position i iff
    sum_{j>=i} nw(t_j) * maxw(t_j) >= t.  Soundness (for ANY fixed
    order): let t* be a qualifying pair's shared term of minimal order;
    if either side did not emit t*, that side's suffix bound at t*
    already upper-bounds the whole cosine below t."""
    empty = pa.table(
        {"tok": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
    )
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return empty
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    o = t["ord"].to_numpy(zero_copy_only=False)
    contrib = t["nw"].to_numpy(zero_copy_only=False) * t["maxw"].to_numpy(
        zero_copy_only=False
    )
    order = np.lexsort((o, d))
    keep = prefix_emit_mask(d[order], contrib[order], threshold)
    return pa.table(
        {
            "tok": pa.array(o[order][keep], pa.int64()),
            "doc_id": pa.array(d[order][keep], pa.int64()),
        }
    )


# ------------------------------------------------ bounded candidate emit ----
#
# The tile machinery is shared repo-wide (util.MAX_TILE / _tiles_in_bucket /
# _expand_tiles / bounded_pair_dataset) — dedup's gram joins and the
# embedding LSH blocker emit through the same bounded path.

import functools as _functools

from ..util import MAX_TILE, _expand_tiles, _tiles_in_bucket

_tiles_by_tok = _functools.partial(_tiles_in_bucket, key_cols=["tok"])


# pair tile tagging / partitioned-lookup verify helpers are shared
# repo-wide (util)
from ..util import VERIFY_PARTS, dedup_tile_groups, tag_pair_tiles

_VERIFY_PARTS = VERIFY_PARTS  # vector hash partitions (util default)
_tag_pair_tiles = tag_pair_tiles


def _vec_lookup(tbl: pa.Table):
    """A vectors partition -> (sorted ids, sizes, starts, flat ords,
    flat ws, norms) for the run-gather dot kernel."""
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    o_blobs = [tbl["ords"][int(i)].as_py() for i in order]
    w_blobs = [tbl["ws"][int(i)].as_py() for i in order]
    sizes = np.array([len(x) // 8 for x in o_blobs], dtype=np.int64)
    flat_o = np.frombuffer(b"".join(o_blobs), dtype=np.uint64)
    flat_w = np.frombuffer(b"".join(w_blobs), dtype=np.float64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    norms = tbl["norm"].to_numpy(zero_copy_only=False)[order]
    return ids[order], sizes, starts, flat_o, flat_w, norms


def _verify_tiles_bucket(
    t: pa.Table, parts_refs: tuple, threshold: float
) -> pa.Table:
    """One tile-keyed bucket of tagged candidate pairs -> exact verified
    pairs — the blocked-matrix-multiply verify.  The task pulls ONLY the
    vector partitions its tiles touch (vector bytes move once per
    occupied tile, bounded by 2 x n_parts x |vectors| across the whole
    stage — never once per candidate pair, which at high candidate
    multiplicity is the dominant cost of a pair-vector join).  A pair's
    tile key is deterministic, so duplicate candidates from different
    token buckets land HERE together and the in-bucket dedup is globally
    exact — the pair stream shuffles exactly once.  The threshold test is
    ``dot >= t * ||a|| ||b||`` — the same algebraic FORM the SQL oracle
    uses, so a disagreement would need two float sums differing only in
    summation order (~1 ulp) to straddle the threshold."""
    import ray

    from .dedup import _run_gather

    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )
    grouped = dedup_tile_groups(t)
    if grouped is None:
        return empty
    a, b, pb_a, pb_b, starts, ends = grouped
    cache: dict = {}
    out_a, out_b, out_c = [], [], []
    for s, e in zip(starts, ends):
        pia, pib = int(pb_a[s]), int(pb_b[s])
        for p in (pia, pib):
            if p not in cache:
                cache[p] = _vec_lookup(ray.get(parts_refs[p]))
        ids_a, sz_a, st_a, fo_a, fw_a, nm_a = cache[pia]
        ids_b, sz_b, st_b, fo_b, fw_b, nm_b = cache[pib]
        ia = np.searchsorted(ids_a, a[s:e])
        ib = np.searchsorted(ids_b, b[s:e])
        la, lb = sz_a[ia], sz_b[ib]
        ords = np.concatenate(
            [_run_gather(fo_a, st_a[ia], la), _run_gather(fo_b, st_b[ib], lb)]
        )
        ws = np.concatenate(
            [_run_gather(fw_a, st_a[ia], la), _run_gather(fw_b, st_b[ib], lb)]
        )
        n = e - s
        pair_idx = np.concatenate(
            [
                np.repeat(np.arange(n, dtype=np.int64), la),
                np.repeat(np.arange(n, dtype=np.int64), lb),
            ]
        )
        o2 = np.lexsort((ords, pair_idx))
        os_, ps, ws_ = ords[o2], pair_idx[o2], ws[o2]
        dup = (os_[1:] == os_[:-1]) & (ps[1:] == ps[:-1])
        prod = ws_[1:][dup] * ws_[:-1][dup]
        dot = np.bincount(ps[1:][dup], weights=prod, minlength=n)
        na, nb = nm_a[ia], nm_b[ib]
        keep2 = dot >= threshold * na * nb
        out_a.append(a[s:e][keep2])
        out_b.append(b[s:e][keep2])
        out_c.append(dot[keep2] / (na[keep2] * nb[keep2]))
    if not out_a:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "cos_sim": pa.array(np.concatenate(out_c), pa.float64()),
        }
    )


def cosine_similarity_join(
    sf_dir: str, threshold_pct: int = 90
) -> pa.Table:
    """All document pairs whose TF-IDF vectors have cosine >=
    ``threshold_pct``% — the WEIGHTED companion of
    :func:`set_similarity_join` (the AllPairs family, Bayardo et al.
    WWW'07): w(d,t) = tf * ln(1 + N/df), exact cosine, (a, b, cos_sim).

    FULLY DISTRIBUTED shape — no vocabulary-, candidate- or corpus-sized
    driver state anywhere (the r04-flagged driver lexicon collect is
    gone); every stage is a bounded map or ONE bucket shuffle:

    1. term order + idf: ``term_stats`` stays a Dataset; the global
       df-ascending term ordinal comes from ``util.global_row_number``
       (range sort + one int per block on the driver) and idf is a
       per-row map.  The vocabulary is never collected or broadcast.
    2. doc vectors: docs flatten to (doc_id, term, tf) rows and meet the
       term table in a ``hash_join`` on term (the lm_score ``top_v``
       lesson, taken further: a rank JOIN, not a capped collect); a
       doc-keyed shuffle assembles per-doc packed (ords, ws, norm)
       vectors — the one reusable artifact, materialized in the object
       store.
    3. AllPairs bound: per-batch (ord, max nw) partials -> ord-keyed
       shuffle = the per-term max normalized weight table, joined back
       onto the exploded vectors by ord, then a doc-keyed regroup applies
       the suffix-bound ``prefix_emit_mask`` (docstring of
       ``_prefix_emit_bucket`` has the soundness argument).
    4. candidates: tok-keyed shuffle -> TILE DESCRIPTORS (never raw
       O(g^2) pairs in one worker heap — ``_tiles_by_tok``), expanded in
       bounded batches.
    5. blocked tile verify (``_verify_tiles_bucket``): the pair stream
       shuffles ONCE on (vector-partition-of-a, of-b); each task pulls
       only its two vector partitions and runs the vectorized run-gather
       dot kernel.  Vector traffic is bounded by 2 x n_parts x |vectors|
       per stage (never per pair) and candidate dedup folds into the
       same shuffle.

    Precision 1 by the verify, recall 1 by the prefix theorem: the
    output hash-compares against the quadratic SQL oracle.
    """
    import functools

    from ..util import global_row_number, hash_groupby
    from .join import hash_join
    from .text import docs_dataset, term_stats

    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cos_sim": pa.array([], pa.float64()),
        }
    )
    ts = term_stats(sf_dir, "simple").materialize()
    n_docs = docs_dataset(sf_dir, ["doc_id"]).count()
    if n_docs == 0 or ts.count() == 0:
        return empty

    # 1. global term ordinal (df asc, term asc) + idf — distributed
    ranked = global_row_number(
        ts.select_columns(["term", "df"]), ["df", "term"], [False, False]
    )

    def add_idf(t: pa.Table) -> pa.Table:
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        ordv = t["rn"].to_numpy(zero_copy_only=False) - 1
        return pa.table(
            {
                "term": t["term"],
                "ord": pa.array(ordv, pa.int64()),
                "idf": pa.array(np.log(1.0 + n_docs / dfv), pa.float64()),
            }
        )

    term_tab = ranked.map_batches(add_idf, batch_format="pyarrow")

    # 2. per-doc packed vectors via term join + doc-keyed shuffle
    flat = docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_DocTermRows, "simple"), batch_format="pyarrow", batch_size=256
    )
    vectors = hash_groupby(
        hash_join(flat, term_tab, on="term"),
        keys=["doc_id"],
        finalize=_assemble_vectors,
    ).materialize()

    # 3. AllPairs per-term bound, joined back by ord; prefix emit per doc
    exploded = vectors.map_batches(_explode_nw, batch_format="pyarrow")
    maxw = hash_groupby(
        exploded.map_batches(
            functools.partial(_max_by_ord, val_col="nw"), batch_format="pyarrow"
        ),
        keys=["ord"],
        finalize=functools.partial(_max_by_ord, val_col="maxw"),
    )
    emitted = hash_groupby(
        hash_join(exploded, maxw, on="ord"),
        keys=["doc_id"],
        finalize=functools.partial(
            _prefix_emit_bucket, threshold=threshold_pct / 100.0
        ),
    )

    # 4. bounded candidate generation (tile descriptors, small batches)
    tiles = hash_groupby(emitted, keys=["tok"], finalize=_tiles_by_tok)
    cand = tiles.map_batches(_expand_tiles, batch_format="pyarrow", batch_size=4)

    # 5. blocked tile verify: the vectors split into n_parts hash
    # partitions held as ObjectRefs; each candidate pair is tagged with
    # its (partition-of-a, partition-of-b) tile and the pair stream
    # shuffles ONCE on the tile key.  Each verify task pulls only its
    # tiles' two vector partitions — vector traffic is bounded by
    # 2 x n_parts x |vectors| for the whole stage, instead of
    # |vector| x candidate-multiplicity for a pair-vector join (measured
    # 2,500x multiplicity on the sf0.1 corpus).  Duplicate candidates
    # land in one bucket (the tile key is a function of (a, b)), so the
    # in-bucket dedup is globally exact with no extra shuffle.
    from ..util import hash_partition_refs

    n_parts = _VERIFY_PARTS
    parts_refs = hash_partition_refs(vectors, ["doc_id"], n_parts)
    out = hash_groupby(
        cand.map_batches(
            functools.partial(_tag_pair_tiles, n_parts=n_parts),
            batch_format="pyarrow",
        ),
        keys=["pb_a", "pb_b"],
        finalize=functools.partial(
            _verify_tiles_bucket,
            parts_refs=parts_refs,
            threshold=threshold_pct / 100.0,
        ),
        num_partitions=64,
    )
    return pairs_table(out, extra_cols=("cos_sim",))


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
