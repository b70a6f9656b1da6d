"""Text/term analytics over a (doc_id, text) table — oracle-checkable ops.

These are the SQL-expressible slices of the engine (term stats = reference
A1/A2 aggregations, doc lengths = A4, corpus counters = A3; SURVEY.md §2.5)
run over the driver's ``documents`` table with the frozen ``simple``
tokenizer, whose semantics are exactly
``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` in DuckDB — verified
token-for-token.  Every float output is either a single division of exact
integer sums or avoided entirely, so the DuckDB value-hash comparison is
deterministic.

Pattern for the wide ops: per-batch partial aggregation inside map_batches
(one row per key per batch) then a small groupby over partials — never a
shuffle of raw token runs (ray_guide "Aggregation at scale").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions.tokenize import TokenNormalizer, doc_term_tf
from ..util import stage_fn

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")


def docs_dataset(sf_dir: str, columns=None) -> ray.data.Dataset:
    """The documents table as a Dataset with column pruning.

    Parquet is the native format (`documents.parquet`); a directory that
    instead carries `documents.jsonl` / `documents.csv` is read through
    the matching Ray Data connector (projection applied post-read — those
    row formats cannot prune at the scan, which is why Parquet is the
    scale path)."""
    import os

    pq_path = f"{sf_dir}/documents.parquet"
    if os.path.exists(pq_path) or not os.path.isdir(sf_dir):
        return ray.data.read_parquet(pq_path, columns=columns)
    jl = f"{sf_dir}/documents.jsonl"
    if os.path.exists(jl):
        ds = ray.data.read_json(jl)
    elif os.path.exists(f"{sf_dir}/documents.csv"):
        ds = ray.data.read_csv(f"{sf_dir}/documents.csv")
    else:
        return ray.data.read_parquet(pq_path, columns=columns)
    return ds.select_columns(list(columns)) if columns else ds


class _TermPartials:
    """batch -> (term, cf_part, df_part): per-batch partial term aggregates."""

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        if not vocab:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "cf_part": pa.array([], pa.int64()),
                    "df_part": pa.array([], pa.int64()),
                }
            )
        cf = np.bincount(tid, weights=tf, minlength=len(vocab)).astype(np.int64)
        df = np.bincount(tid, minlength=len(vocab)).astype(np.int64)
        return pa.table(
            {"term": pa.array(vocab), "cf_part": pa.array(cf), "df_part": pa.array(df)}
        )


class _DocTokenStats:
    """batch -> per-doc (doc_id, n_tokens, n_unique, token_chars, stop_count)."""

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(batch)
        tlen = np.array([len(v) for v in vocab], dtype=np.int64)
        stop = np.array([v in STOPWORDS for v in vocab], dtype=np.int64)
        n_tokens = np.bincount(d, weights=tf, minlength=n).astype(np.int64)
        n_unique = np.bincount(d, minlength=n).astype(np.int64)
        token_chars = np.bincount(d, weights=tf * tlen[tid], minlength=n).astype(np.int64)
        stop_count = np.bincount(d, weights=tf * stop[tid], minlength=n).astype(np.int64)
        keep = n_tokens > 0  # SQL group-by drops token-less docs
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(n_tokens[keep]),
                "n_unique": pa.array(n_unique[keep]),
                "token_chars": pa.array(token_chars[keep]),
                "stop_count": pa.array(stop_count[keep]),
            }
        )


def term_stats(sf_dir: str, mode: str = "simple") -> ray.data.Dataset:
    """(term, cf, df) — reference A1 (getUseCount) + A2 (documentCount).

    Partials combine per batch, then ONE task-based hash shuffle on term +
    a per-bucket Arrow sum (``util.hash_groupby``) — same data movement as
    a hash-shuffle groupby, but on Ray's warm task workers instead of a
    fresh sort-aggregate actor pool per call (the windowed_events
    cold-session fix, applied here for the same reason)."""

    def finalize(t: pa.Table) -> pa.Table:
        if "term" not in t.column_names:  # empty corpus: column-less block
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "cf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["term"], use_threads=False).aggregate(
            [("cf_part", "sum"), ("df_part", "sum")]
        )
        return g.rename_columns(["term", "cf", "df"])

    from ..util import hash_groupby

    return hash_groupby(
        docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
            stage_fn(_TermPartials, mode), batch_format="pyarrow", batch_size=512
        ),
        keys=["term"],
        finalize=finalize,
    )


def topk_by_cf(ds: ray.data.Dataset, k: int):
    """Per-block local top-k by (cf DESC, term ASC) + driver merge of the
    k x blocks candidate rows — THE combiner for "global top-k of a
    term-keyed dataset" (``top_sessions`` shape): correct for any
    batching because each term appears in exactly one row globally.
    Returns the merged pandas frame (k rows)."""

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        cf = t["cf"].to_numpy(zero_copy_only=False)
        term = t["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((term, -cf))[:k]
        return t.take(pa.array(order))

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return (
        cand.sort_values(["cf", "term"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def top_terms(sf_dir: str, k: int = 100) -> pa.Table:
    """Global top-k terms by cf without a full lexicon sort: term_stats'
    hash shuffle already puts each term in exactly one block, so the
    :func:`topk_by_cf` combiner reduces the driver merge to k x blocks
    candidate rows — the lexicon itself is never sorted or collected."""
    out = topk_by_cf(term_stats(sf_dir), k)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return pa.Table.from_pandas(out, preserve_index=False)


def doc_lengths(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens) — reference A4 per-doc length."""
    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(stage_fn(_DocTokenStats), batch_format="pyarrow", batch_size=512)
        .select_columns(["doc_id", "n_tokens"])
    )


def quality_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality features: token/unique/char/stopword counts."""
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_DocTokenStats), batch_format="pyarrow", batch_size=512
    )


def corpus_stats(sf_dir: str) -> pa.Table:
    """One row: N, total_tokens, distinct_terms, avgdl."""
    ts = term_stats(sf_dir)
    agg = ts.aggregate(Sum("cf", alias_name="total_tokens"), Count(alias_name="distinct_terms"))
    n = docs_dataset(sf_dir, ["doc_id"]).count()
    total = int(agg["total_tokens"])
    return pa.table(
        {
            "N": pa.array([n], pa.int64()),
            "total_tokens": pa.array([total], pa.int64()),
            "distinct_terms": pa.array([int(agg["distinct_terms"])], pa.int64()),
            "avgdl": pa.array([total / n], pa.float64()),
        }
    )


class _PerLangPartials:
    """batch -> per-lang (docs_part, tokens_part) partials."""

    def __init__(self):
        self.norm = TokenNormalizer("simple")

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, _, tf, _ = doc_term_tf(batch["text"], self.norm)
        n_tokens = np.bincount(d, weights=tf, minlength=len(batch)).astype(np.int64)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(langs, return_inverse=True)
        return pa.table(
            {
                "lang": pa.array(uniq),
                "docs_part": pa.array(np.bincount(inv).astype(np.int64)),
                "tokens_part": pa.array(
                    np.bincount(inv, weights=n_tokens).astype(np.int64)
                ),
            }
        )


def token_count_by_lang(sf_dir: str) -> ray.data.Dataset:
    """(lang, docs, tokens) — doc counts + exact token sums per lang."""

    return (
        docs_dataset(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(stage_fn(_PerLangPartials), batch_format="pyarrow", batch_size=512)
        .groupby("lang")
        .aggregate(Sum("docs_part", alias_name="docs"), Sum("tokens_part", alias_name="tokens"))
    )


class _BigramPartials:
    """batch -> (bigram, cf_part): adjacent-token-pair partial counts.

    ``tokenize_batch`` keeps occurrences in document order, so a bigram is
    any consecutive pair with the same doc index; pairs are counted via an
    int64 ``a * V + b`` encoding (V = batch vocab size) — one bincount,
    no string concat until the surviving distinct pairs."""

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import tokenize_batch

        d, tid, vocab = tokenize_batch(batch[self.text_col], self.norm)
        if len(tid) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "cf_part": pa.array([], pa.int64())}
            )
        adj = d[1:] == d[:-1]
        v = len(vocab)
        pair = tid[:-1][adj] * v + tid[1:][adj]
        uniq, cnt = np.unique(pair, return_counts=True)
        a, b = uniq // v, uniq % v
        return pa.table(
            {
                "bigram": pa.array(
                    [f"{vocab[i]} {vocab[j]}" for i, j in zip(a, b)], pa.string()
                ),
                "cf_part": pa.array(cnt.astype(np.int64)),
            }
        )


def bigram_counts(sf_dir: str, min_count: int = 5) -> ray.data.Dataset:
    """(bigram, cf) for bigrams with corpus frequency >= min_count — the
    LM-style n-gram count table a training pipeline builds; partial counts
    per batch, one groupby, threshold filter after the merge."""
    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_BigramPartials), batch_format="pyarrow", batch_size=512
        )
        .groupby("bigram")
        .aggregate(Sum("cf_part", alias_name="cf"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["cf"], min_count)),
            batch_format="pyarrow",
        )
    )


def bigram_counts_sql_oracle(min_count: int = 5) -> str:
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        b AS (
          SELECT unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM arr
        )
        SELECT bigram, CAST(count(*) AS BIGINT) AS cf
        FROM b GROUP BY 1 HAVING count(*) >= {min_count}
    """


class _TopKwStage:
    """batch -> per-doc top-k TF-IDF keywords; (df map, N, k) via ctor."""

    def __init__(self, df_ref, n_docs: int, k: int):
        self.df: dict = ray.get(df_ref)
        self.n_docs = n_docs
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        n_docs, k = self.n_docs, self.k
        d, tid, tf, vocab = doc_term_tf(batch["text"], TokenNormalizer("simple"))
        if not vocab:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        dfget = self.df.get
        vdf = np.fromiter(
            (dfget(v, 1) for v in vocab), dtype=np.int64, count=len(vocab)
        )
        vidf = np.fromiter(
            (math.log(n_docs / x) for x in vdf.tolist()),
            dtype=np.float64,
            count=len(vdf),
        )
        score = tf * vidf[tid]
        # per-vocab sorted rank = the "term ASC" tie-break as an int key
        trank = np.empty(len(vocab), dtype=np.int64)
        trank[np.argsort(np.array(vocab, dtype=object), kind="stable")] = np.arange(
            len(vocab)
        )
        order = np.lexsort((trank[tid], -score, d))
        ds_, tids_, tfs_ = d[order], tid[order], tf[order]
        new_doc = np.empty(len(ds_), dtype=bool)
        new_doc[0] = True
        np.not_equal(ds_[1:], ds_[:-1], out=new_doc[1:])
        seg = np.cumsum(new_doc) - 1
        starts = np.flatnonzero(new_doc)
        rank = np.arange(len(ds_)) - starts[seg] + 1
        keep = rank <= k
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        terms = pa.array(vocab, pa.string()).take(
            pa.array(tids_[keep], pa.int64())
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[ds_[keep]], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
                "term": terms,
                "tf": pa.array(tfs_[keep], pa.int64()),
                "df": pa.array(vdf[tids_[keep]], pa.int64()),
            }
        )



def keywords_tfidf(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Per-doc top-k TF-IDF keywords: (doc_id, rank, term, tf, df).

    Two passes.  Pass 1 reduces the corpus to the global (term -> df) map
    (vocab-sized — broadcast once via ``ray.put``; at a scale where the
    full vocab no longer fits a worker this becomes a df-pruned vocab or a
    term-keyed join, the scoring pass is unchanged).  Pass 2 streams docs:
    per-batch (doc, term, tf) + one vectorized lexsort gives every doc its
    k best terms with NO shuffle at all — ranking is local to the doc.

    Scores are ``tf * ln(N / df)``; the log runs through scalar libm per
    DISTINCT vocab term (not numpy's vectorized log) so rank tie-breaks
    are bit-identical with the DuckDB oracle's ``ln``.  Output keeps only
    exact integers; ties break by term ascending.
    """
    import math

    df_tbl = pa.concat_tables(
        ray.get(term_stats(sf_dir).select_columns(["term", "df"]).to_arrow_refs())
    )
    n_docs = docs_dataset(sf_dir, ["doc_id"]).count()
    df_ref = ray.put(
        dict(zip(df_tbl["term"].to_pylist(), df_tbl["df"].to_numpy(zero_copy_only=False)))
    )

    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_TopKwStage, df_ref, n_docs, k),
        batch_format="pyarrow",
        batch_size=512,
    )


def keywords_tfidf_sql_oracle(k: int = 5) -> str:
    return f"""
        WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text),
             '[^a-z0-9]+')) AS term FROM documents),
        t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        tfd AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM t GROUP BY 1, 2),
        dfx AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                FROM t GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM documents),
        scored AS (
          SELECT tfd.doc_id, tfd.term, tfd.tf, dfx.df,
                 tfd.tf * ln(n.N / dfx.df) AS s
          FROM tfd JOIN dfx USING (term), n
        )
        SELECT doc_id, rank, term, tf, df FROM (
          SELECT doc_id, term, tf, df,
                 CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY s DESC, term ASC) AS BIGINT) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def sha256_map(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, content_sha256) — the per-row invariant, SQL-checkable."""
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        sha = [hashlib.sha256(s.encode()).hexdigest() for s in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "content_sha256": pa.array(sha, pa.string())}
        )

    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def windowed_events(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1h windows over the events stream table.

    (user_id, window_start, event_type) -> n events, exact value cents sum,
    min/max value.  Batch pipeline over an ordered log — Ray Data has no
    event-time windows, so the window key is computed per batch and the
    partial aggregates shuffle by (user, window, type).
    """

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch["ts"], unit="hour")
        # half_towards_infinity matches DuckDB round() (half-away-from-zero);
        # pc.round's default half-to-even would diverge on exact .5 cents.
        cents = pc.round(
            pc.multiply(batch["value"], 100.0), round_mode="half_towards_infinity"
        ).cast(pa.int64())
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "window_start": w,
                "event_type": batch["event_type"],
                "cents": cents,
                "value": batch["value"],
            }
        )
        g = t.group_by(["user_id", "window_start", "event_type"], use_threads=False).aggregate(
            [("cents", "count"), ("cents", "sum"), ("value", "min"), ("value", "max")]
        )
        return g.rename_columns(
            ["user_id", "window_start", "event_type", "n_part", "cents_part", "vmin_part", "vmax_part"]
        )

    def finalize(t: pa.Table) -> pa.Table:
        # partition holds every row of its user_ids -> plain Arrow groupby
        # is exact; (user, window, type) cardinality ~ event count on this
        # stream, so the sort-based Aggregate would re-sort ~everything
        g = t.group_by(
            ["user_id", "window_start", "event_type"], use_threads=False
        ).aggregate(
            [("n_part", "sum"), ("cents_part", "sum"),
             ("vmin_part", "min"), ("vmax_part", "max")]
        )
        return g.rename_columns(
            ["user_id", "window_start", "event_type",
             "n", "value_cents", "value_min", "value_max"]
        )

    from ..util import hash_groupby

    return hash_groupby(
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["user_id", "ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192),
        keys=["user_id"],
        finalize=finalize,
    )


GREP_PATTERN = "(data|stream|window)[a-z]*"


def regex_search(sf_dir: str, pattern: str = GREP_PATTERN) -> ray.data.Dataset:
    """Distributed grep: per-document regex match counts over ``text``.

    (doc_id, n_matches) for every document with >= 1 non-overlapping match
    of ``pattern`` (RE2 semantics, case-sensitive over lowercased text —
    identical on both sides: pyarrow's count_substring_regex and DuckDB's
    regexp_extract_all are both RE2).  Vectorized per batch; the filter
    prunes non-matching docs before anything leaves the task.  The workhorse
    for content-based corpus triage at scale (license scan, marker strings,
    contamination probes).
    """

    def grep(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.utf8_lower(batch["text"]), pattern)
        t = pa.table(
            {"doc_id": batch["doc_id"], "n_matches": n.cast(pa.int64())}
        )
        return t.filter(pc.greater(t["n_matches"], 0))

    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        grep, batch_format="pyarrow"
    )


def regex_search_sql_oracle(pattern: str = GREP_PATTERN) -> str:
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{pattern}')) AS BIGINT)
                 AS n_matches
        FROM documents
        WHERE len(regexp_extract_all(lower(text), '{pattern}')) > 0
    """


def collocations(
    sf_dir: str, min_pair: int = 5, lift_x10: int = 14
) -> ray.data.Dataset:
    """Statistically associated word pairs: adjacent bigrams whose observed
    count exceeds the independence expectation by ``lift_x10/10``x.

    (a, b, n_ab, n_a, n_b) where lift = n_ab * T / (n_a * n_b) and the
    comparison is the exact integer cross-multiply
    ``10 * n_ab * T >= lift_x10 * n_a * n_b`` (no float ordering anywhere).
    Bigram counts stream through the existing partial-agg groupby; the
    unigram table is collected once and broadcast (at a vocabulary too big
    for that, the finish step becomes two hash_joins on a and b — same
    downstream filter).
    """
    uni = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_TermPartials), batch_format="pyarrow", batch_size=512
        )
        .groupby("term")
        .aggregate(Sum("cf_part", alias_name="cf"))
        .to_pandas()
    )
    cf_map = dict(zip(uni["term"], uni["cf"].astype(int)))
    total = int(uni["cf"].sum())
    ref = ray.put(cf_map)

    def finish(t: pa.Table) -> pa.Table:
        cf = ray.get(ref)
        pair = pc.split_pattern(t["bigram"], " ")
        flat = pair.combine_chunks().flatten().to_pylist()
        a, b = flat[0::2], flat[1::2]
        n_ab = t["cf"].to_numpy(zero_copy_only=False)
        n_a = np.fromiter((cf[x] for x in a), dtype=np.int64, count=len(a))
        n_b = np.fromiter((cf[x] for x in b), dtype=np.int64, count=len(b))
        keep = 10 * n_ab * total >= lift_x10 * n_a * n_b
        return pa.table(
            {
                "a": pa.array(a, pa.string()),
                "b": pa.array(b, pa.string()),
                "n_ab": pa.array(n_ab, pa.int64()),
                "n_a": pa.array(n_a),
                "n_b": pa.array(n_b),
            }
        ).filter(pa.array(keep))

    return bigram_counts(sf_dir, min_count=min_pair).map_batches(
        finish, batch_format="pyarrow"
    )


def collocations_sql_oracle(min_pair: int = 5, lift_x10: int = 14) -> str:
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        t AS (SELECT unnest(toks) AS term FROM arr),
        u AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
        tot AS (SELECT count(*) AS T FROM t),
        bg AS (
          SELECT unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM arr
        ),
        b AS (
          SELECT split_part(bigram, ' ', 1) AS a,
                 split_part(bigram, ' ', 2) AS b,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM bg GROUP BY 1, 2 HAVING count(*) >= {min_pair}
        )
        SELECT a, b, n_ab, ua.n AS n_a, ub.n AS n_b
        FROM b
        JOIN u ua ON ua.term = a
        JOIN u ub ON ub.term = b
        CROSS JOIN tot
        WHERE 10 * n_ab * T >= {lift_x10} * ua.n * ub.n
    """


def term_freq_spectrum(sf_dir: str) -> ray.data.Dataset:
    """Zipf diagnostic: (cf, n_terms) — how many distinct terms occur with
    each corpus frequency.  Two small shuffles over already-collapsed rows
    (term partials, then one row per distinct cf value per batch)."""

    def spectrum(batch: pa.Table) -> pa.Table:
        cf = batch["cf"].to_numpy(zero_copy_only=False)
        u, c = np.unique(cf, return_counts=True)
        return pa.table(
            {"cf": pa.array(u, pa.int64()), "n_part": pa.array(c.astype(np.int64))}
        )

    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_TermPartials), batch_format="pyarrow", batch_size=512
        )
        .groupby("term")
        .aggregate(Sum("cf_part", alias_name="cf"))
        .map_batches(spectrum, batch_format="pyarrow")
        .groupby("cf")
        .aggregate(Sum("n_part", alias_name="n_terms"))
    )


def term_freq_spectrum_sql_oracle() -> str:
    return """
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT term FROM tok WHERE term <> ''),
        u AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM t GROUP BY 1)
        SELECT cf, CAST(count(*) AS BIGINT) AS n_terms FROM u GROUP BY 1
    """


class _SkipgramPartials:
    """batch -> (pair, n_part): windowed co-occurrence partial counts.

    Word2vec-style skipgram pairs: (tok[i], tok[i+d]) for every distance
    1 <= d <= window within one document.  Same int64 ``a * V + b``
    encoding trick as ``_BigramPartials`` — one np.unique per batch over
    the concatenated distance strata, strings materialized only for the
    surviving distinct pairs."""

    def __init__(self, window: int = 3, mode: str = "simple", text_col: str = "text"):
        self.window = int(window)
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import tokenize_batch

        empty = pa.table(
            {"pair": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
        )
        d, tid, vocab = tokenize_batch(batch[self.text_col], self.norm)
        v = len(vocab)
        strata = []
        for dist in range(1, self.window + 1):
            if len(tid) <= dist:
                break
            adj = d[dist:] == d[:-dist]
            strata.append(tid[:-dist][adj] * v + tid[dist:][adj])
        if not strata:
            return empty
        uniq, cnt = np.unique(np.concatenate(strata), return_counts=True)
        a, b = uniq // v, uniq % v
        return pa.table(
            {
                "pair": pa.array(
                    [f"{vocab[i]} {vocab[j]}" for i, j in zip(a, b)], pa.string()
                ),
                "n_part": pa.array(cnt.astype(np.int64)),
            }
        )


def skipgram_counts(
    sf_dir: str, window: int = 3, min_pair: int = 5
) -> ray.data.Dataset:
    """Windowed (skipgram) co-occurrence counts: ordered pairs of tokens at
    distance <= window within a document, kept when the pair count reaches
    ``min_pair`` — the co-occurrence table embedding trainers (word2vec,
    GloVe) build first.  ``bigram_counts`` is the window=1 special case;
    here each batch emits pre-collapsed partials (the x window fan-out
    never crosses the shuffle row-per-occurrence), one groupby merges."""

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_pair"], min_pair))
        if t.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "n_pair": pa.array([], pa.int64()),
                }
            )
        flat = pc.split_pattern(t["pair"], " ").combine_chunks().flatten()
        idx = np.arange(len(flat), dtype=np.int64)
        return pa.table(
            {
                "a": flat.take(pa.array(idx[0::2])),
                "b": flat.take(pa.array(idx[1::2])),
                "n_pair": t["n_pair"],
            }
        )

    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_SkipgramPartials, window), batch_format="pyarrow", batch_size=512
        )
        .groupby("pair")
        .aggregate(Sum("n_part", alias_name="n_pair"))
        .map_batches(finish, batch_format="pyarrow")
    )


def skipgram_counts_sql_oracle(window: int = 3, min_pair: int = 5) -> str:
    strata = "\n          UNION ALL\n".join(
        f"""          SELECT unnest(list_transform(
                   range(1, greatest(len(toks) - {d}, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+{d}])) AS pg
          FROM arr"""
        for d in range(1, window + 1)
    )
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        sg AS (
{strata}
        )
        SELECT split_part(pg, ' ', 1) AS a,
               split_part(pg, ' ', 2) AS b,
               CAST(count(*) AS BIGINT) AS n_pair
        FROM sg GROUP BY 1, 2 HAVING count(*) >= {min_pair}
    """


class _SourceTermPartials:
    """batch -> (source, term, cf_part): per-(source, term) partial counts
    via one (source_code * V + term_id) bincount — no per-row Python."""

    def __init__(self, mode: str = "simple", text_col: str = "text"):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "cf_part": pa.array([], pa.int64()),
            }
        )
        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        if not vocab:
            return empty
        codes, cats = pd.factorize(
            batch["source"].to_numpy(zero_copy_only=False)
        )
        cats = list(cats)
        if (codes < 0).any():  # factorize marks nulls -1; without this the
            codes = codes.copy()  # a*V+b encoding floor-divides them onto
            codes[codes < 0] = len(cats)  # the LAST real source
            cats.append(None)
        v = len(vocab)
        pair = codes[d].astype(np.int64) * v + tid
        uniq, inv = np.unique(pair, return_inverse=True)
        cf = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cf, inv, tf)
        return pa.table(
            {
                "source": pa.array([cats[i] for i in uniq // v], pa.string()),
                "term": pa.array([vocab[i] for i in uniq % v], pa.string()),
                "cf_part": pa.array(cf),
            }
        )


def top_terms_by_source(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Trending terms: the k most frequent tokens per document source,
    ranked (cf DESC, term ASC) — the per-channel vocabulary dashboard a
    corpus monitor maintains.  Per-batch (source, term) partials collapse
    map-side; one bucket shuffle on source; the per-source finalize merges
    partials and cuts top-k with a deterministic tie-break."""

    def finalize(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "cf": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.group_by(["source", "term"], use_threads=False).aggregate(
            [("cf_part", "sum")]
        )
        # per-source top-k: sort by (source, -cf, term), rank within source
        g = g.sort_by(
            [("source", "ascending"), ("cf_part_sum", "descending"), ("term", "ascending")]
        )
        src = g["source"].to_numpy(zero_copy_only=False)
        new = np.r_[True, src[1:] != src[:-1]]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        rank = np.arange(len(src), dtype=np.int64) - starts[seg] + 1
        keep = rank <= k
        return pa.table(
            {
                "source": g["source"].filter(pa.array(keep)),
                "rank": pa.array(rank[keep], pa.int64()),
                "term": g["term"].filter(pa.array(keep)),
                "cf": g["cf_part_sum"].filter(pa.array(keep)).cast(pa.int64()),
            }
        )

    from ..util import hash_groupby

    parts = docs_dataset(sf_dir, ["doc_id", "text", "source"]).map_batches(
        stage_fn(_SourceTermPartials), batch_format="pyarrow", batch_size=512
    )
    return hash_groupby(parts, ["source"], finalize)


def top_terms_by_source_sql_oracle(k: int = 10) -> str:
    return f"""
        WITH arr AS (
          SELECT doc_id, source,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        t AS (SELECT source, unnest(toks) AS term FROM arr),
        c AS (
          SELECT source, term, CAST(count(*) AS BIGINT) AS cf
          FROM t GROUP BY 1, 2
        ),
        r AS (
          SELECT source, term, cf,
                 CAST(row_number() OVER (
                   PARTITION BY source ORDER BY cf DESC, term ASC
                 ) AS BIGINT) AS rank
          FROM c
        )
        SELECT source, rank, term, cf FROM r WHERE rank <= {k}
    """


# -------------------------------------------------- doc-level co-occurrence


COOC_MIN_SUPPORT = 25  # pair kept if it co-occurs in >= this many docs


def term_cooccurrence(sf_dir: str, min_support: int = COOC_MIN_SUPPORT) -> ray.data.Dataset:
    """Market-basket co-occurrence: (term_a, term_b, n_docs) for every
    unordered pair of DISTINCT terms sharing >= ``min_support``
    documents — the document-level companion to the sequence-adjacency
    ``bigram_counts``/``collocations`` (PMI matrices, embedding co-count
    statistics).

    Per batch: per-doc distinct-term sets -> all in-doc pairs (cached
    triu index tables per set size; the pair loop is per DOC over
    vectorized per-doc work, and per-doc distinct terms bound the O(k^2)
    blowup — real deployments cap k by keeping only top-frequency
    terms), pre-aggregated to (a, b, cnt) before the one groupby.
    Exact integer counts."""

    class _PairPartials:
        def __init__(self):
            self.norm = TokenNormalizer("simple")
            self._triu: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        def _pairs(self, k: int) -> tuple[np.ndarray, np.ndarray]:
            if k not in self._triu:
                self._triu[k] = np.triu_indices(k, 1)
            return self._triu[k]

        def __call__(self, batch: pa.Table) -> pa.Table:
            d, tid, _tf, vocab = doc_term_tf(batch["text"], self.norm)
            empty = pa.table(
                {
                    "term_a": pa.array([], pa.string()),
                    "term_b": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
            if not vocab:
                return empty
            order = np.lexsort((tid, d))
            ds, ts = d[order], tid[order]
            starts = np.flatnonzero(
                np.concatenate([[True], ds[1:] != ds[:-1]])
            )
            bounds = np.append(starts, len(ds))
            pa_ids, pb_ids = [], []
            for s, e in zip(bounds[:-1], bounds[1:]):
                k = e - s
                if k < 2:
                    continue
                i, j = self._pairs(int(k))
                seg = ts[s:e]  # sorted distinct term ids (lexsort + dedup
                pa_ids.append(seg[i])  # per (doc, term) from doc_term_tf)
                pb_ids.append(seg[j])
            if not pa_ids:
                return empty
            a = np.concatenate(pa_ids)
            b = np.concatenate(pb_ids)
            key = a.astype(np.int64) * np.int64(len(vocab)) + b
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv).astype(np.int64)
            va = np.asarray(vocab, dtype=object)
            a_s = va[(uk // len(vocab))]
            b_s = va[(uk % len(vocab))]
            # vocab ids are first-appearance order; canonicalize each pair
            # to string order (term_a < term_b) like the SQL self-join.
            # Unordered pairs keep unique keys after the swap: one doc
            # emits each unordered pair once, so no in-batch collision.
            sw = a_s > b_s
            ta = np.where(sw, b_s, a_s)
            tb = np.where(sw, a_s, b_s)
            return pa.table(
                {
                    "term_a": pa.array(ta.tolist(), pa.string()),
                    "term_b": pa.array(tb.tolist(), pa.string()),
                    "cnt": pa.array(cnt, pa.int64()),
                }
            )

    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_PairPartials), batch_format="pyarrow", batch_size=512
        )
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("cnt", alias_name="n_docs"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["n_docs"], min_support)),
            batch_format="pyarrow",
        )
    )


def term_cooccurrence_sql_oracle(min_support: int = COOC_MIN_SUPPORT) -> str:
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), dt AS (SELECT DISTINCT doc_id, term FROM tok WHERE term <> '')
        SELECT x.term AS term_a, y.term AS term_b,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM dt x JOIN dt y ON x.doc_id = y.doc_id AND x.term < y.term
        GROUP BY 1, 2 HAVING count(*) >= {min_support}
    """
