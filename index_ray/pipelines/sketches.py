"""Mergeable sketches over the driver tables — the approximate counters a
100 TB pipeline substitutes for exact shuffles.

``distinct_users_hll``: HyperLogLog distinct counting.  Per batch each
(event_type) gets a 2^p register array (one pass, no shuffle of raw
rows); registers are trivially mergeable by max, so the only exchange is
O(batches x types x 2^p bytes).  The exact count (for the consistency
contract) runs beside it: per-batch unique pairs -> one groupby.  At
100 TB the exact leg is the expensive one — a real deployment drops it
and keeps the sketch; here it feeds the oracle row.

The estimator is the standard HLL of Flajolet et al. 2007 (raw harmonic
mean, alpha_m bias constant, linear-counting small-range correction) over
a splitmix64 hash — all published constants, no library dependency.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _registers(users: np.ndarray, p: int) -> np.ndarray:
    """HLL registers (uint8[2^p]) for a batch of int64 ids."""
    h = _splitmix64(users)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, top-aligned
    # rho = leading zeros of the remaining bits + 1 (capped at 64-p+1)
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    # float64 exponent trick: for x!=0, leading zeros = 63 - floor(log2(x))
    lz[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    rho = np.minimum(lz, 64 - p) + 1
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)  # p >= 7
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:  # linear-counting small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def distinct_users_hll(sf_dir: str, p: int = 12) -> pa.Table:
    """(event_type, n_distinct, hll_within_5pct) — exact distinct users per
    event type next to a 1-if-within-5% flag for the HLL estimate (the
    oracle pins the exact count and the flag; the estimate itself is
    deterministic but not SQL-expressible)."""

    def partial_regs(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        types, inv = np.unique(et, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "regs": pa.array(
                    [_registers(uid[inv == i], p).tobytes() for i in range(len(types))],
                    pa.binary(),
                ),
            }
        )

    def merge_regs(group: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for b in group["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "hll_est": pa.array([_estimate(merged, p)], pa.float64()),
            }
        )

    def partial_pairs(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        keys = np.char.add(np.char.add(et.astype(str), "\x00"), uid.astype(str))
        _, first = np.unique(keys, return_index=True)
        return pa.table(
            {
                "event_type": pa.array(et[first], pa.string()),
                "user_id": pa.array(uid[first], pa.int64()),
            }
        )

    def count_distinct(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "n_distinct": pa.array([len(np.unique(u))], pa.int64()),
            }
        )

    src = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    est = (
        src.map_batches(partial_regs, batch_format="pyarrow", batch_size=16384)
        .groupby("event_type")
        .map_groups(merge_regs, batch_format="pyarrow")
        .to_pandas()
    )
    exact = (
        src.map_batches(partial_pairs, batch_format="pyarrow", batch_size=16384)
        .groupby("event_type")
        .map_groups(count_distinct, batch_format="pyarrow")
        .to_pandas()
    )
    j = exact.merge(est, on="event_type")
    ok = (
        (j["hll_est"] - j["n_distinct"]).abs() <= 0.05 * j["n_distinct"]
    ).astype(np.int64)
    return pa.table(
        {
            "event_type": pa.array(j["event_type"], pa.string()),
            "n_distinct": pa.array(j["n_distinct"].to_numpy(), pa.int64()),
            "hll_within_5pct": pa.array(ok.to_numpy(), pa.int64()),
        }
    )


def distinct_users_hll_sql_oracle() -> str:
    return """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
               CAST(1 AS BIGINT) AS hll_within_5pct
        FROM events GROUP BY 1
    """


# ----------------------------------------------------------- count-min


_CMS_W = 4096
_CMS_D = 4
_CMS_SALTS = np.array([0xA5A5, 0x5A5A, 0xC3C3, 0x3C3C], dtype=np.uint64)


def _cms_rows(term_hashes: np.ndarray) -> np.ndarray:
    """(d, n) bucket indices for each term hash."""
    return np.stack(
        [
            (_splitmix64(term_hashes ^ s) % np.uint64(_CMS_W)).astype(np.int64)
            for s in _CMS_SALTS
        ]
    )


def cms_term_counts(sf_dir: str, k: int = 100) -> pa.Table:
    """(term, cf, cms_no_undercount) — count-min sketch point queries for
    the exact top-k terms.

    The sketch is one (d x w) int64 matrix per batch (64 KB), summed on
    the driver — mergeable by addition, so the exchange is O(batches x
    d*w) regardless of vocabulary size.  CMS can only OVERcount, so
    ``estimate >= true cf`` is deterministic — that one-sided bound is the
    pinned flag; the epsilon bound is probabilistic and lives in pytest.
    Exact counts ride the existing term_stats partials."""
    from .text import term_stats

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import TokenNormalizer, doc_term_tf

        _, tid, tf, vocab = doc_term_tf(batch["text"], TokenNormalizer("simple"))
        sk = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        if vocab:
            h = np.array([_term_hash(t) for t in vocab], dtype=np.uint64)
            rows = _cms_rows(h)
            cf = np.bincount(tid, weights=tf, minlength=len(vocab)).astype(np.int64)
            for d in range(_CMS_D):
                np.add.at(sk[d], rows[d], cf)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    def fold(batch: pa.Table) -> pa.Table:
        # tree-fold level: sum up to 64 partial sketches per task so the
        # driver's final fold sees O(blocks/64) rows, not one per batch —
        # at 1e6+ batches the unfolded stream would be driver-unbounded
        acc = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for b in batch["sk"]:
            acc += np.frombuffer(b.as_py(), dtype=np.int64).reshape(_CMS_D, _CMS_W)
        return pa.table({"sk": pa.array([acc.tobytes()], pa.binary())})

    parts = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=512)
        .map_batches(fold, batch_format="pyarrow", batch_size=64)
        .to_pandas()
    )
    sk = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for b in parts["sk"]:
        sk += np.frombuffer(b, dtype=np.int64).reshape(_CMS_D, _CMS_W)

    top = (
        term_stats(sf_dir)
        .to_pandas()
        .sort_values(["cf", "term"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    h = np.array([_term_hash(t) for t in top["term"]], dtype=np.uint64)
    rows = _cms_rows(h)
    est = np.min(
        np.stack([sk[d][rows[d]] for d in range(_CMS_D)]), axis=0
    )
    ok = (est >= top["cf"].to_numpy()).astype(np.int64)
    return pa.table(
        {
            "term": pa.array(top["term"], pa.string()),
            "cf": pa.array(top["cf"].to_numpy(), pa.int64()),
            "cms_no_undercount": pa.array(ok, pa.int64()),
        }
    )


def _term_hash(s: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def cms_term_counts_sql_oracle(k: int = 100) -> str:
    return f"""
        WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text),
         '[^a-z0-9]+')) AS term FROM documents),
        t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        s AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM t GROUP BY term)
        SELECT term, cf, CAST(1 AS BIGINT) AS cms_no_undercount
        FROM s ORDER BY cf DESC, term ASC LIMIT {k}
    """


# -------------------------------------------------- DDSketch quantiles


_DD_ALPHA = 0.01  # relative-accuracy guarantee of the sketch


def approx_percentiles(sf_dir: str) -> pa.Table:
    """(event_type, n, p50_cents, p90_cents, p99_cents, sketch_within_2pct)
    — exact per-type percentiles (the oracle pins them) next to a
    1-if-within-bound flag for a DDSketch-style log-bucket quantile sketch.

    The sketch is the unbounded-domain companion to the exact
    bounded-integer histogram of ``events.value_percentiles``: bucket
    ``ceil(log_gamma(v))`` with gamma=(1+a)/(1-a) guarantees every read
    quantile is within relative error ``a`` of the true rank value, while
    the shuffle moves O(types x buckets) rows (a few hundred) no matter
    how many events stream through.  Merge = bucket-count sum, so partial
    sketches combine associatively across batches/nodes.
    """
    gamma = (1.0 + _DD_ALPHA) / (1.0 - _DD_ALPHA)
    log_gamma = np.log(gamma)
    qs = (0.5, 0.9, 0.99)

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        bucket = np.ceil(np.log(v) / log_gamma).astype(np.int64)  # v > 0
        t = pa.table(
            {"event_type": pa.array(et, pa.string()), "bucket": pa.array(bucket)}
        )
        g = t.group_by(["event_type", "bucket"], use_threads=False).aggregate(
            [("bucket", "count")]
        )
        return g.rename_columns(["event_type", "bucket", "cnt"])

    def finalize(group: pa.Table) -> pa.Table:
        b = group["bucket"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        cnt = np.bincount(inv, weights=c).astype(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        ests = []
        for q in qs:
            i = int(ub[np.searchsorted(cum, int(np.ceil(q * n)))])
            ests.append(2.0 * gamma**i / (gamma + 1.0))
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "n_sk": pa.array([n], pa.int64()),
                "est50": pa.array([ests[0]], pa.float64()),
                "est90": pa.array([ests[1]], pa.float64()),
                "est99": pa.array([ests[2]], pa.float64()),
            }
        )

    sk = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
        .to_pandas()
    )
    from .events import value_percentiles

    exact = value_percentiles(sf_dir).to_pandas()
    j = exact.merge(sk, on="event_type")
    ok = np.ones(len(j), dtype=np.int64)
    for q, est in (("p50_cents", "est50"), ("p90_cents", "est90"), ("p99_cents", "est99")):
        # sketch guarantee is relative alpha on the value; allow 2*alpha
        # plus one cent of rounding slack against the exact-cents oracle
        bad = (j[est] * 100.0 - j[q]).abs() > 2 * _DD_ALPHA * j[q] + 1.0
        ok[bad.to_numpy()] = 0
    return pa.table(
        {
            "event_type": pa.array(j["event_type"], pa.string()),
            "n": pa.array(j["n"].to_numpy(), pa.int64()),
            "p50_cents": pa.array(j["p50_cents"].to_numpy(), pa.int64()),
            "p90_cents": pa.array(j["p90_cents"].to_numpy(), pa.int64()),
            "p99_cents": pa.array(j["p99_cents"].to_numpy(), pa.int64()),
            "sketch_within_2pct": pa.array(ok, pa.int64()),
        }
    )


def approx_percentiles_sql_oracle() -> str:
    return """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS BIGINT) AS p50_cents,
               CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.9) AS BIGINT) AS p90_cents,
               CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS BIGINT) AS p99_cents,
               CAST(1 AS BIGINT) AS sketch_within_2pct
        FROM events GROUP BY 1
    """


# -------------------------------------------------- Misra-Gries heavy hitters


# k counters; the two-level merge (per-batch MG + one global reduction)
# deducts at most 2N/(k+1) from any term's count, so every term with
# cf >= T = floor(2N/(k+1)) + 1 is GUARANTEED to survive as a candidate.
MG_COUNTERS = 512


def _mg_reduce(
    terms: np.ndarray, wts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """One Misra-Gries(k) reduction over exact (or summed-MG) weights:
    subtract the (k+1)-th largest weight from everyone, keep positives —
    the vectorized equivalent of classic counter eviction (at most k
    survivors, each underestimated by exactly the deduction)."""
    keep = wts > 0
    if keep.sum() <= k:
        return terms[keep], wts[keep]
    d = np.partition(wts, len(wts) - k - 1)[len(wts) - k - 1]
    keep = wts > d
    return terms[keep], wts[keep] - d


def heavy_hitter_terms(sf_dir: str) -> pa.Table:
    """(term, cf) for every term with cf >= floor(2N/(k+1)) + 1 — EXACT
    counts, found without ever shuffling the full vocabulary.

    Two-pass deterministic heavy hitters (Misra-Gries 1982 + the mergeable-
    summaries bound of Agarwal et al., PODS'12):

    1. Candidate sweep: each batch reduces its exact term counts to an
       MG(k) summary (<= k (term, weight) rows, deduction <= n_batch/(k+1));
       the summaries are summed per term through one small bucket shuffle
       (``util.hash_groupby`` — rows crossing it are <= batches x k, never
       vocabulary-sized), each bucket emits its local top-(k+1), and one
       global reduction on the driver keeps <= k candidate terms.  Total
       deduction <= 2N/(k+1), so candidates is a SUPERSET of every term
       with cf >= T regardless of batch/merge order.
    2. Exact confirm: the candidate list (<= k strings) is broadcast once;
       each batch emits one dense k-vector of candidate counts (the CMS
       partial pattern — O(k) per batch, no shuffle), the driver sums and
       filters cf >= T.

    The output is exactly the SQL answer (the oracle recomputes T from the
    corpus), independent of partitioning — the sketch only bounds WHERE
    the candidates can hide, never what is reported."""
    import pandas as pd

    from ..functions.tokenize import TokenNormalizer, doc_term_tf
    from ..util import hash_groupby, stage_fn

    def partial(batch: pa.Table) -> pa.Table:
        _, tid, tf, vocab = doc_term_tf(batch["text"], TokenNormalizer("simple"))
        if not vocab:
            return pa.table(
                {"term": pa.array([], pa.string()), "wt": pa.array([], pa.int64())}
            )
        cf = np.bincount(tid, weights=tf, minlength=len(vocab)).astype(np.int64)
        n_tok = int(cf.sum())
        terms, wts = _mg_reduce(np.asarray(vocab, object), cf, MG_COUNTERS)
        # sentinel row "" carries the batch token count (the simple
        # tokenizer never emits an empty token, so no collision); it always
        # survives the merge because N >= any single term's weight
        return pa.table(
            {
                "term": pa.array(list(terms) + [""], pa.string()),
                "wt": pa.array(np.concatenate([wts, [n_tok]]), pa.int64()),
            }
        )

    def bucket_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("term", as_index=False)["wt"].sum()
        sent = df[df["term"] == ""]
        rest = df[df["term"] != ""].nlargest(MG_COUNTERS + 1, "wt")
        return pa.Table.from_pandas(
            pd.concat([rest, sent], ignore_index=True), preserve_index=False
        )

    tops = hash_groupby(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=512),
        ["term"],
        bucket_topk,
    ).to_pandas()

    n_total = int(tops.loc[tops["term"] == "", "wt"].sum())
    cand_df = tops[tops["term"] != ""]
    terms, wts = _mg_reduce(
        cand_df["term"].to_numpy(object),
        cand_df["wt"].to_numpy(np.int64),
        MG_COUNTERS,
    )
    threshold = 2 * n_total // (MG_COUNTERS + 1) + 1
    candidates = sorted(terms.tolist())

    import ray as _ray

    cand_ref = _ray.put(candidates)

    def cnt_fold(batch: pa.Table) -> pa.Table:
        # tree-fold level: sum up to 64 partial count vectors per task so
        # the driver's final fold is O(blocks/64), not one row per batch
        acc: np.ndarray | None = None
        for b in batch["cnt"]:
            v = np.frombuffer(b.as_py(), dtype=np.int64)
            acc = v.copy() if acc is None else acc + v
        if acc is None:
            return pa.table({"cnt": pa.array([], pa.binary())})
        return pa.table({"cnt": pa.array([acc.tobytes()], pa.binary())})

    counts = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(
            stage_fn(_HHConfirmStage, cand_ref),
            batch_format="pyarrow",
            batch_size=512,
        )
        .map_batches(cnt_fold, batch_format="pyarrow", batch_size=64)
        .to_pandas()
    )
    total = np.zeros(len(candidates), np.int64)
    for b in counts["cnt"]:
        total += np.frombuffer(b, dtype=np.int64)
    keep = total >= threshold
    return pa.table(
        {
            "term": pa.array([c for c, k_ in zip(candidates, keep) if k_], pa.string()),
            "cf": pa.array(total[keep], pa.int64()),
        }
    )


class _HHConfirmStage:
    """batch -> one dense int64 vector of exact counts over the broadcast
    candidate terms (resolved once per worker process)."""

    def __init__(self, cand_ref):
        import pandas as pd
        import ray as _ray

        self.index = pd.Index(_ray.get(cand_ref))
        self.norm = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import TokenNormalizer, doc_term_tf

        if self.norm is None:
            self.norm = TokenNormalizer("simple")
        out = np.zeros(len(self.index), np.int64)
        _, tid, tf, vocab = doc_term_tf(batch["text"], self.norm)
        if vocab:
            pos = self.index.get_indexer(np.asarray(vocab, object))
            sel = pos >= 0
            cf = np.bincount(tid, weights=tf, minlength=len(vocab)).astype(np.int64)
            np.add.at(out, pos[sel], cf[sel])
        return pa.table({"cnt": pa.array([out.tobytes()], pa.binary())})


def heavy_hitter_terms_sql_oracle() -> str:
    return f"""
        WITH tok AS (SELECT unnest(regexp_split_to_array(lower(text),
         '[^a-z0-9]+')) AS term FROM documents),
        t AS (SELECT term FROM tok WHERE term <> ''),
        s AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM t GROUP BY term)
        SELECT term, cf FROM s
        WHERE cf >= 2 * (SELECT count(*) FROM t) // {MG_COUNTERS + 1} + 1
    """


def hll_intersections(sf_dir: str, p: int = 13) -> pa.Table:
    """HLL set algebra: distinct-user overlap for every unordered pair of
    event types — (type_a, type_b, n_both, ie_within_10pct).

    Sketch leg: one register array per type (mergeable by max, the same
    partial pass as :func:`distinct_users_hll`); the driver holds only
    ``types x 2^p`` bytes and derives every pairwise union by register
    max, then the intersection by inclusion–exclusion
    ``|A ∩ B| = |A| + |B| - |A ∪ B|``.  That subtraction amplifies the
    relative error (each term carries ~1.04/sqrt(m) of ITS OWN scale),
    which is exactly what the flag pins: the estimate must land within
    10% of the true intersection on this data, or the row goes red.

    Exact leg (feeds the oracle): distinct (type, user) pairs, then a
    user-bucketed shuffle where each bucket emits per-pair partial
    counts over ITS users — the cross-type pair table never exceeds
    C(types, 2) rows per bucket, so the final fold is driver-trivial.
    """
    from ..util import hash_groupby

    src = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial_regs(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        types, inv = np.unique(et, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "regs": pa.array(
                    [_registers(uid[inv == i], p).tobytes() for i in range(len(types))],
                    pa.binary(),
                ),
            }
        )

    def merge_regs(group: pa.Table) -> pa.Table:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for b in group["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
        return pa.table(
            {
                "event_type": pa.array([group["event_type"][0].as_py()]),
                "regs": pa.array([merged.tobytes()], pa.binary()),
            }
        )

    regs_tbl = (
        src.map_batches(partial_regs, batch_format="pyarrow", batch_size=16384)
        .groupby("event_type")
        .map_groups(merge_regs, batch_format="pyarrow")
        .to_pandas()
    )
    regs = {
        r["event_type"]: np.frombuffer(r["regs"], dtype=np.uint8)
        for _, r in regs_tbl.iterrows()
    }

    def pair_partials(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("type_a", pa.string()), ("type_b", pa.string()), ("cnt", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        types, tcode = np.unique(et, return_inverse=True)
        key = uid * np.int64(len(types)) + tcode
        ukey = np.unique(key)
        u = ukey // len(types)
        c = (ukey % len(types)).astype(np.int64)
        # per user: all ordered type-code pairs (a < b in type order)
        new = np.concatenate([[True], u[1:] != u[:-1]])
        grp_start = np.flatnonzero(new)
        sizes = np.diff(np.append(grp_start, len(u)))
        ends = np.repeat(grp_start + sizes, sizes)
        pos = np.arange(len(u), dtype=np.int64)
        counts = ends - pos - 1
        tot = int(counts.sum())
        if tot == 0:
            return schema.empty_table()
        starts = np.repeat(pos + 1, counts)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ia = np.repeat(c, counts)
        ib = c[starts + within]
        pk, pcnt = np.unique(ia * np.int64(len(types)) + ib, return_counts=True)
        return pa.table(
            {
                "type_a": pa.array(types[pk // len(types)], pa.string()),
                "type_b": pa.array(types[pk % len(types)], pa.string()),
                "cnt": pa.array(pcnt.astype(np.int64)),
            }
        )

    parts = hash_groupby(src, ["user_id"], pair_partials).to_pandas()
    if len(parts) == 0:
        exact: dict = {}
    else:
        exact = (
            parts.groupby(["type_a", "type_b"])["cnt"].sum().to_dict()
        )

    out_a, out_b, out_n, out_ok = [], [], [], []
    for (a, b), n_both in sorted(exact.items()):
        est_a = _estimate(regs[a], p)
        est_b = _estimate(regs[b], p)
        est_u = _estimate(np.maximum(regs[a], regs[b]), p)
        est_i = est_a + est_b - est_u
        out_a.append(a)
        out_b.append(b)
        out_n.append(int(n_both))
        out_ok.append(int(abs(est_i - n_both) <= 0.10 * n_both))
    return pa.table(
        {
            "type_a": pa.array(out_a, pa.string()),
            "type_b": pa.array(out_b, pa.string()),
            "n_both": pa.array(out_n, pa.int64()),
            "ie_within_10pct": pa.array(out_ok, pa.int64()),
        }
    )


def hll_intersections_sql_oracle() -> str:
    return """
        WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both,
               CAST(1 AS BIGINT) AS ie_within_10pct
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    """


def vocab_size_hll(sf_dir: str, p: int = 12) -> pa.Table:
    """(n_terms, hll_within_5pct) — the exact corpus vocabulary size next
    to a 1-if-within-5% flag for its HyperLogLog estimate over md5 term
    hashes (mergeable uint8 registers; one 2^p-byte blob per batch crosses
    the wire, never term strings).  The estimate itself is deterministic
    but not SQL-expressible; the oracle pins the exact count + the flag,
    and the exact leg is recomputed engine-side from the same
    tokenization.
    """
    from ..functions.tokenize import TokenNormalizer
    from ..functions.tokenize import tokenize_batch as _tb
    from .text import docs_dataset

    def partial(batch: pa.Table) -> pa.Table:
        _, _, vocab = _tb(batch["text"], TokenNormalizer("simple"))
        hashes = np.array(
            [_term_hash(v) for v in vocab], dtype=np.uint64
        ) if vocab else np.empty(0, np.uint64)
        return pa.table(
            {
                "regs": pa.array([_registers(hashes.astype(np.int64), p).tobytes()],
                                 pa.binary()),
                "terms": pa.array([",".join(sorted(set(vocab)))], pa.string()),
            }
        )

    parts = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    merged = np.zeros(1 << p, dtype=np.uint8)
    exact: set[str] = set()
    for b, ts in zip(parts["regs"], parts["terms"]):
        np.maximum(merged, np.frombuffer(b, dtype=np.uint8), out=merged)
        if ts:
            exact.update(ts.split(","))
    est = _estimate(merged, p)
    n = len(exact)
    ok = 1 if n and abs(est - n) / n <= 0.05 else 0
    return pa.table(
        {
            "n_terms": pa.array([n], pa.int64()),
            "hll_within_5pct": pa.array([ok], pa.int64()),
        }
    )


def vocab_size_hll_sql_oracle() -> str:
    return """
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        )
        SELECT CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
               CAST(1 AS BIGINT) AS hll_within_5pct
        FROM tok WHERE term <> ''
    """
