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
