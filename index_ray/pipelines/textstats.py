"""Language-ID and document fingerprinting stages (training-data ops).

Heuristic, dependency-free, deterministic — rows-only checked (not
SQL-expressible).  Both are stateless Arrow batch transforms; the stopword
profiles / hash tables are built once per worker.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.minhash import hash_strings
from ..functions.tokenize import TokenNormalizer, tokenize_batch
from ..util import stage_fn
from .text import docs_dataset

# tiny stopword profiles; scores are integer hit counts -> deterministic
_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the a of to and in is on for with that this it as are be".split()),
    "fr": frozenset("le la les de des du et un une est dans pour que sur avec".split()),
    "es": frozenset("el la los las de del y un una es en para que por con".split()),
    "de": frozenset("der die das und ein eine ist in zu den von mit auf für".split()),
}
_LANGS = sorted(_PROFILES)


class LangIdStage:
    """batch -> (doc_id, pred_lang, hits, n_tokens).

    n-gram-free stopword-profile scorer + CJK codepoint ratio for 'zh';
    ties broken by language code order.  pred over synthetic corpora is a
    deterministic function of the text, not a claim about the true lang.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.norm = TokenNormalizer("simple")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        d, tid, vocab = tokenize_batch(batch[self.text_col], self.norm)
        hits = np.zeros((len(_LANGS), len(batch)), dtype=np.int64)
        vprof = np.zeros((len(_LANGS), len(vocab)), dtype=np.int64)
        for li, lang in enumerate(_LANGS):
            prof = _PROFILES[lang]
            vprof[li] = [v in prof for v in vocab]
        for li in range(len(_LANGS)):
            hits[li] = np.bincount(d, weights=vprof[li][tid], minlength=len(batch))
        n_tokens = np.bincount(d, minlength=len(batch)).astype(np.int64)
        preds, best = [], []
        for i, text in enumerate(texts):
            cjk = sum(1 for c in text[:400] if "一" <= c <= "鿿")
            if cjk > 10:
                preds.append("zh")
                best.append(int(cjk))
                continue
            li = int(np.argmax(hits[:, i]))  # argmax: first max wins (code order)
            preds.append(_LANGS[li] if hits[li, i] > 0 else "unknown")
            best.append(int(hits[li, i]))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
                "hits": pa.array(best, pa.int64()),
                "n_tokens": pa.array(n_tokens),
            }
        )


def language_id(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(LangIdStage), batch_format="pyarrow", batch_size=512
    )


class FingerprintStage:
    """batch -> (doc_id, n_grams, fingerprint) — winnowing fingerprints.

    Token 4-gram hashes (md5-high-64 of the space-joined gram, so DuckDB
    recomputes them bit-identically), robust-winnowed with window w=5 (min
    hash per window; short docs < w grams contribute their single overall
    min); the doc fingerprint is sha256 over the comma-joined sorted
    distinct selected hashes.  Standard winnowing (Schleimer et al.,
    SIGMOD'03) — shared substrings of >= w+k-1 tokens yield shared selected
    hashes.  Docs with < k tokens have no grams and fingerprint ''.
    """

    K = 4
    W = 5

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.norm = TokenNormalizer("simple")
        self._md5_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.minhash import md5_strings

        d, tid, vocab = tokenize_batch(batch[self.text_col], self.norm)
        n = len(batch)
        starts = np.searchsorted(d, np.arange(n))
        ends = np.searchsorted(d, np.arange(n), side="right")
        fps, ngrams = [], []
        for i in range(n):
            toks = [vocab[t] for t in tid[starts[i]:ends[i]]]
            m = max(len(toks) - self.K + 1, 0)
            if m == 0:
                fps.append("")
                ngrams.append(0)
                continue
            gram_strs = [" ".join(toks[j : j + self.K]) for j in range(m)]
            grams = md5_strings(gram_strs, self._md5_cache)
            if m <= self.W:
                sel = np.array([grams.min()], dtype=np.uint64)
            else:
                # min per sliding window of W, vectorized
                idx = np.arange(m - self.W + 1)[:, None] + np.arange(self.W)[None, :]
                sel = np.unique(grams[idx].min(axis=1))
            joined = ",".join(str(int(v)) for v in np.sort(sel))
            fps.append(hashlib.sha256(joined.encode()).hexdigest())
            ngrams.append(int(m))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(ngrams, pa.int64()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(FingerprintStage), batch_format="pyarrow", batch_size=512
    )


# BPE-style pre-tokenizer (GPT-2-flavoured, lookahead-free so RE2/DuckDB
# runs the identical pattern): contractions, letter runs, digit runs,
# other-symbol runs, stray apostrophes.  Whitespace is the explicit ASCII
# class so Python re and RE2 agree byte-for-byte.
_WS = " \\t\\n\\r\\f\\v"
BPE_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9'" + _WS + "]+|'"
)


class TokenCountStage:
    """batch -> (doc_id, n_bpe_tokens, n_ws_tokens) — token counting for
    training-data budgeting: a BPE-ish regex pre-tokenizer count (the unit
    a byte-pair encoder would split further) plus the plain whitespace
    count.  The compiled patterns live in ``__init__`` (once per actor)."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.bpe = re.compile(BPE_PATTERN)
        self.ws = re.compile("[^" + _WS + "]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        nb = np.fromiter(
            (len(self.bpe.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
        )
        nw = np.fromiter(
            (len(self.ws.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(nb),
                "n_ws_tokens": pa.array(nw),
            }
        )


def token_count_bpe(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(TokenCountStage), batch_format="pyarrow", batch_size=1024
    )


def token_count_bpe_sql_oracle() -> str:
    pat = BPE_PATTERN.replace("'", "''")
    ws = "[^" + _WS + "]+"
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '{ws}')) AS BIGINT) AS n_ws_tokens
        FROM documents
    """


# ----------------------------------------------------------- unigram LM ----


class _DocLMScore:
    """batch -> (doc_id, n_tokens, sum_log2p, avg_log2p) via a broadcast
    unigram log-probability table (read once per worker process)."""

    def __init__(self, mode: str, logp_ref, floor: float, text_col: str = "text"):
        import ray

        self.norm = TokenNormalizer(mode)
        self.logp = ray.get(logp_ref)
        self.floor = floor
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import doc_term_tf

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "sum_log2p": pa.array([], pa.float64()),
                "avg_log2p": pa.array([], pa.float64()),
            }
        )
        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        if len(d) == 0:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lp = np.array([self.logp.get(v, self.floor) for v in vocab], dtype=np.float64)
        n = len(batch)
        n_tok = np.bincount(d, weights=tf, minlength=n).astype(np.int64)
        slp = np.bincount(d, weights=tf.astype(np.float64) * lp[tid], minlength=n)
        mask = n_tok > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], pa.int64()),
                "n_tokens": pa.array(n_tok[mask], pa.int64()),
                "sum_log2p": pa.array(slp[mask], pa.float64()),
                "avg_log2p": pa.array(slp[mask] / n_tok[mask], pa.float64()),
            }
        )


def lm_score(
    sf_dir: str, mode: str = "simple", top_v: int | None = 1_000_000
) -> ray.data.Dataset:
    """Unigram-language-model document scoring — the CCNet-style "how
    surprising is this document under the corpus LM" quality signal.

    Pass 1 estimates p(term) = cf/total over the whole corpus (the
    existing ``term_stats`` partial-aggregate pipeline); pass 2 broadcasts
    the log2-probability table once (``ray.put``, read per worker, never
    re-shipped per batch) and scores each document as
    sum over its distinct terms of tf * log2(cf/total).

    (doc_id, n_tokens, sum_log2p, avg_log2p), token-less documents
    omitted (they have no LM score), sorted by doc_id.

    DRIVER-MEMORY BOUND — the distributed ``top_v`` path IS the default
    (1M terms): the candidate set is reduced by a per-block local top-V +
    driver merge of V x blocks rows (the ``top_terms`` combiner shape —
    the lexicon is never collected), the corpus total comes from a
    distributed sum, and tail terms score at the OOV floor
    log2(1/total).  ``top_v=None`` is the explicit EXACT opt-in: it
    collects the FULL vocabulary cf table on the driver — fine at test
    scale (and what the oracle-equality tests pin the default against,
    since a sub-``top_v`` vocabulary makes the two modes identical), a
    driver OOM at 10^12 docs where the Zipf-collapsed vocabulary is
    still billions of terms.
    """
    import ray

    from .text import term_stats

    schema = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "sum_log2p": pa.array([], pa.float64()),
            "avg_log2p": pa.array([], pa.float64()),
        }
    )
    if top_v is None:
        # exact mode: full-vocab collect (driver-memory bound above)
        cf = term_stats(sf_dir, mode).to_pandas()
        if len(cf) == 0:
            return ray.data.from_arrow(schema)
        total = int(cf["cf"].sum())
    else:
        # scale mode: the driver only ever sees top_v x blocks candidate
        # rows and one scalar; the full lexicon stays distributed
        from ray.data.aggregate import Sum

        from .text import topk_by_cf

        ts = term_stats(sf_dir, mode).materialize()
        agg = ts.aggregate(Sum("cf", alias_name="total"))
        total = int(agg["total"] or 0)
        if total == 0:
            return ray.data.from_arrow(schema)
        cf = topk_by_cf(ts, top_v)
    floor = float(np.log2(1.0 / np.float64(total)))
    logp = dict(
        zip(
            cf["term"],
            np.log2(cf["cf"].to_numpy().astype(np.float64) / np.float64(total)),
        )
    )
    ref = ray.put(logp)
    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_DocLMScore, mode, ref, floor),
            batch_format="pyarrow",
            batch_size=512,
        )
        .sort("doc_id")
    )


class _DocBigramLM:
    """batch -> (doc_id, n_bigrams, sum_log2p, avg_log2p) via a broadcast
    bigram conditional-log-probability table."""

    def __init__(self, mode: str, logp_ref, floor: float, text_col: str = "text"):
        import ray

        self.norm = TokenNormalizer(mode)
        self.logp = ray.get(logp_ref)
        self.floor = floor
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "sum_log2p": pa.array([], pa.float64()),
                "avg_log2p": pa.array([], pa.float64()),
            }
        )
        d, tid, vocab = tokenize_batch(batch[self.text_col], self.norm)
        if len(d) < 2:
            return empty
        toks = np.asarray(vocab, dtype=object)[tid]
        n = len(toks) - 1
        gram = toks[:n] + " "
        gram = gram + toks[1:]
        valid = d[:n] == d[1:]  # bigram must not straddle documents
        if not valid.any():
            return empty
        dv = d[:n][valid]
        codes, uniq = pd.factorize(gram[valid])
        lp = np.array(
            [self.logp.get(g, self.floor) for g in uniq], dtype=np.float64
        )
        # per-(doc, bigram) occurrence counts, then n * log2p — the same
        # summation structure the SQL oracle groups by
        key = dv.astype(np.int64) * len(uniq) + codes
        ukey, cnt = np.unique(key, return_counts=True)
        udoc = ukey // len(uniq)
        ucode = ukey % len(uniq)
        nb = len(batch)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_big = np.bincount(udoc, weights=cnt, minlength=nb).astype(np.int64)
        slp = np.bincount(udoc, weights=cnt * lp[ucode], minlength=nb)
        mask = n_big > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], pa.int64()),
                "n_bigrams": pa.array(n_big[mask], pa.int64()),
                "sum_log2p": pa.array(slp[mask], pa.float64()),
                "avg_log2p": pa.array(slp[mask] / n_big[mask], pa.float64()),
            }
        )


class _CtxPartials:
    """batch of (bigram, cf) rows -> per-left-context partial totals for
    a broadcast context set (the kept bigrams' contexts, <= top_b)."""

    def __init__(self, ctx_ref):
        import ray

        self.want = ray.get(ctx_ref)  # sorted object array of contexts

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {"w1": pa.array([], pa.string()), "h_part": pa.array([], pa.int64())}
        )
        if t.num_rows == 0 or len(self.want) == 0:
            return empty
        w1 = pc.list_element(
            pc.split_pattern(t["bigram"], " "), 0
        ).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.want, w1)
        pos_c = np.clip(pos, 0, len(self.want) - 1)
        mask = self.want[pos_c] == w1
        if not mask.any():
            return empty
        cfv = t["cf"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(w1[mask], return_inverse=True)
        h = np.bincount(inv, weights=cfv[mask]).astype(np.int64)
        return pa.table(
            {"w1": pa.array(u, pa.string()), "h_part": pa.array(h, pa.int64())}
        )


def lm_bigram_score(
    sf_dir: str, mode: str = "simple", top_b: int | None = 1_000_000
) -> ray.data.Dataset:
    """Bigram-language-model document scoring — the KenLM-flavored step up
    from ``lm_score``: each document scores
    sum over its bigrams of log2 p(w2 | w1), with the MLE conditional
    p(w2 | w1) = count(w1 w2) / count(w1 as a left context) estimated on
    the corpus itself (so every in-document bigram has a probability; no
    backoff needed for the self-trained case).

    Pass 1 builds the distributed bigram count table (the existing
    ``bigram_counts`` partial-aggregate pipeline, unthresholded); pass 2
    broadcasts the log-probability table once and scores per document.
    (doc_id, n_bigrams, sum_log2p, avg_log2p), documents with < 2 tokens
    omitted, sorted by doc_id.

    DRIVER-MEMORY BOUND — the distributed ``top_b`` path IS the default
    (1M bigrams, the ``lm_score`` shape): the broadcast table is reduced
    by a per-block local top-B + driver merge, the grand total comes
    from a distributed sum, the kept bigrams' left-context totals are
    partial-aggregated behind a broadcast context set (<= B contexts, so
    their h(w1) sums are FULL-corpus exact), and tail bigrams score at
    the floor log2(1/total).  ``top_b=None`` is the explicit EXACT
    opt-in (full-table driver collect) — identical to the default
    whenever the bigram table fits under the cap, which is what the
    oracle-equality tests pin.
    """
    import ray

    from .text import bigram_counts

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "sum_log2p": pa.array([], pa.float64()),
            "avg_log2p": pa.array([], pa.float64()),
        }
    )
    if top_b is None:
        # exact mode: full-table driver collect (test-scale oracle anchor)
        cf = bigram_counts(sf_dir, min_count=1).to_pandas()
        if len(cf) == 0:
            return ray.data.from_arrow(empty)
        total = int(cf["cf"].sum())
        w1 = cf["bigram"].str.split(" ", n=1).str[0]
        h = cf.groupby(w1)["cf"].transform("sum").to_numpy()
        lp = np.log2(cf["cf"].to_numpy().astype(np.float64) / h.astype(np.float64))
        logp = dict(zip(cf["bigram"], lp))
    else:
        from ray.data.aggregate import Sum

        ds = bigram_counts(sf_dir, min_count=1).materialize()
        agg = ds.aggregate(Sum("cf", alias_name="total"))
        total = int(agg["total"] or 0)
        if total == 0:
            return ray.data.from_arrow(empty)

        def local_topk(t: pa.Table) -> pa.Table:
            if t.num_rows <= top_b:
                return t
            cfv = t["cf"].to_numpy(zero_copy_only=False)
            bg = t["bigram"].to_numpy(zero_copy_only=False)
            order = np.lexsort((bg, -cfv))[:top_b]
            return t.take(pa.array(order))

        cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
        keep = cand.sort_values(
            ["cf", "bigram"], ascending=[False, True]
        ).head(top_b)
        ctxs = np.array(
            sorted({b.split(" ", 1)[0] for b in keep["bigram"]}), dtype=object
        )
        h_parts = (
            ds.map_batches(
                stage_fn(_CtxPartials, ray.put(ctxs)),
                batch_format="pyarrow",
            ).to_pandas()
        )
        h_map = h_parts.groupby("w1")["h_part"].sum()
        hv = h_map.loc[
            [b.split(" ", 1)[0] for b in keep["bigram"]]
        ].to_numpy()
        lp = np.log2(
            keep["cf"].to_numpy().astype(np.float64) / hv.astype(np.float64)
        )
        logp = dict(zip(keep["bigram"], lp))
    floor = float(np.log2(1.0 / np.float64(total)))
    ref = ray.put(logp)
    return (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_DocBigramLM, mode, ref, floor),
            batch_format="pyarrow",
            batch_size=512,
        )
        .sort("doc_id")
    )


def lm_bigram_score_sql_oracle() -> str:
    return """
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM arr
        ),
        c2 AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
        h AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(c) AS hc
              FROM c2 GROUP BY 1),
        per AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY doc_id, bigram)
        SELECT per.doc_id,
               CAST(sum(per.n) AS BIGINT) AS n_bigrams,
               sum(per.n * log2(c2.c / h.hc)) AS sum_log2p,
               sum(per.n * log2(c2.c / h.hc)) / sum(per.n) AS avg_log2p
        FROM per
        JOIN c2 USING (bigram)
        JOIN h ON h.w1 = string_split(per.bigram, ' ')[1]
        GROUP BY per.doc_id ORDER BY per.doc_id
    """


# --------------------------------------------------- CCNet LM buckets ----


class _DocLMQuant:
    """batch -> (doc_id, lang, q_milli): the unigram-LM per-token score
    quantized to integer milli-units (floor(avg_log2p * 1000 + 0.5), the
    same IEEE expression the SQL oracle evaluates), with the document's
    lang carried through so the bucket pass never joins."""

    def __init__(self, mode: str, logp_ref, floor: float):
        import ray

        self.norm = TokenNormalizer(mode)
        self.logp = ray.get(logp_ref)
        self.floor = floor

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import doc_term_tf

        d, tid, tf, vocab = doc_term_tf(batch["text"], self.norm)
        if len(d) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "q_milli": pa.array([], pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lp = np.array([self.logp.get(v, self.floor) for v in vocab], dtype=np.float64)
        n = len(batch)
        n_tok = np.bincount(d, weights=tf, minlength=n).astype(np.int64)
        slp = np.bincount(d, weights=tf.astype(np.float64) * lp[tid], minlength=n)
        mask = n_tok > 0
        q = np.floor(slp[mask] / n_tok[mask] * 1000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], pa.int64()),
                "lang": pa.array(
                    batch["lang"].to_numpy(zero_copy_only=False)[mask], pa.string()
                ),
                "q_milli": pa.array(q, pa.int64()),
            }
        )


def ccnet_buckets(sf_dir: str, mode: str = "simple") -> ray.data.Dataset:
    """CCNet-style per-language LM-quality bucketing (Wenzek et al. 2020):
    score every document under the corpus unigram LM, then split each
    language's documents into head / middle / tail thirds by score rank
    (head = least surprising).

    (doc_id, lang, q_milli, rank, bucket); token-less documents are
    unscored and omitted (same contract as ``lm_score``).  Rank is dense
    row_number within lang ordered by (q_milli DESC, doc_id ASC); the
    thirds rule is floor-based: positions [0, n/3) head, [n/3, 2n/3)
    middle, rest tail.

    Quantization note: q_milli = floor(avg * 1000 + 0.5) is an exact-
    compared integer derived from float math evaluated independently by
    numpy and DuckDB; both sum the identical per-(doc, term) summands, so
    the residual risk is a 1-ulp summation-order difference landing within
    ~2e-13 of an integer boundary — accepted (same trade as
    centroid_classify's integer quantization, which uses the identical
    floor(x * scale + 0.5) construction).

    Scale shape: pass 1 is the ``term_stats`` partial-aggregate (vocab-
    sized result, broadcast once); pass 2 is a stateless scoring map; the
    bucket pass is ONE hash shuffle keyed on lang.  A single language's
    rows must fit one reducer here (exact ranks, like the oracle); CCNet's
    own production variant avoids that by computing the two per-lang score
    thresholds from a sample and bucketing with a broadcast threshold
    table — same output contract, no per-lang materialization — which is
    the drop-in 100 TB path once exact rank ties stop mattering.
    """
    import ray

    from ..util import hash_groupby
    from .text import docs_dataset, term_stats

    cf = term_stats(sf_dir, mode).to_pandas()
    if len(cf) == 0:
        return ray.data.from_arrow(_CCNET_EMPTY)
    total = int(cf["cf"].sum())
    floor = float(np.log2(1.0 / np.float64(total)))
    logp = dict(
        zip(
            cf["term"],
            np.log2(cf["cf"].to_numpy().astype(np.float64) / np.float64(total)),
        )
    )
    ref = ray.put(logp)
    scored = docs_dataset(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        stage_fn(_DocLMQuant, mode, ref, floor),
        batch_format="pyarrow",
        batch_size=512,
    )
    return hash_groupby(scored, ["lang"], _ccnet_rank_bucket)


_CCNET_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "q_milli": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "bucket": pa.array([], pa.string()),
    }
)


def _ccnet_rank_bucket(bucket: pa.Table) -> pa.Table:
    """Rank-and-bucket every lang present in one shuffle bucket (a bucket
    holds ALL rows of each lang hashed into it)."""
    import pandas as pd

    if bucket.num_rows == 0:
        return _CCNET_EMPTY
    ids = bucket["doc_id"].to_numpy(zero_copy_only=False)
    q = bucket["q_milli"].to_numpy(zero_copy_only=False)
    lang = bucket["lang"].to_numpy(zero_copy_only=False)
    lcodes, _ = pd.factorize(lang)
    order = np.lexsort((ids, -q, lcodes))
    lc_s = lcodes[order]
    starts = np.flatnonzero(np.r_[True, lc_s[1:] != lc_s[:-1]])
    runs = np.diff(np.r_[starts, len(lc_s)])
    rank = np.arange(len(lc_s)) - np.repeat(starts, runs) + 1
    n = np.repeat(runs, runs)
    r0 = rank - 1
    buck = np.where(
        3 * r0 < n, "head", np.where(3 * r0 < 2 * n, "middle", "tail")
    )
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "lang": pa.array(lang[order], pa.string()),
            "q_milli": pa.array(q[order], pa.int64()),
            "rank": pa.array(rank, pa.int64()),
            "bucket": pa.array(buck, pa.string()),
        }
    )


def ccnet_buckets_sql_oracle() -> str:
    return """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        cf AS (SELECT term, count(*) AS cf FROM t GROUP BY term),
        tot AS (SELECT count(*) AS total FROM t),
        per AS (SELECT doc_id, term, count(*) AS n FROM t GROUP BY doc_id, term),
        score AS (
          SELECT per.doc_id,
                 CAST(floor(sum(per.n * log2(cf.cf / tot.total))
                            / sum(per.n) * 1000 + 0.5) AS BIGINT) AS q_milli
          FROM per JOIN cf USING (term) CROSS JOIN tot
          GROUP BY per.doc_id
        ),
        j AS (SELECT s.doc_id, d.lang, s.q_milli
              FROM score s JOIN documents d USING (doc_id)),
        r AS (SELECT *,
                     CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY q_milli DESC, doc_id ASC
                     ) AS BIGINT) AS rank,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM j)
        SELECT doc_id, lang, q_milli, rank,
               CASE WHEN 3 * (rank - 1) < n THEN 'head'
                    WHEN 3 * (rank - 1) < 2 * n THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM r
    """


# ------------------------------------------------- DSIR importance ----

DSIR_BUCKETS = 1024


def _dsir_gram_buckets(
    batch: pa.Table, norm: TokenNormalizer, nb: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, bucket) for every unigram + bigram OCCURRENCE in the
    batch (DSIR's hashed n-gram features).  The md5-prefix bucket hash is
    chosen for cross-engine reproducibility with the SQL oracle (same
    construction as ``hash_split``); a production run would swap in the
    vectorized FNV ``hash_strings`` — only this one function changes."""
    import hashlib

    d, tid, vocab = tokenize_batch(batch["text"], norm)
    if len(d) == 0:
        return d[:0], np.empty(0, np.int64)
    vb = np.array(
        [int(hashlib.md5(v.encode()).hexdigest()[:8], 16) % nb for v in vocab],
        dtype=np.int64,
    )
    uni_d, uni_b = d, vb[tid]
    toks = np.asarray(vocab, dtype=object)[tid]
    n = len(toks) - 1
    if n > 0:
        valid = d[:n] == d[1:]
    else:
        valid = np.zeros(0, bool)
    if valid.any():
        import pandas as pd

        gram = (toks[:n] + " ")[valid] + toks[1:][valid]
        codes, uniq = pd.factorize(gram)
        gb = np.array(
            [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % nb for g in uniq],
            dtype=np.int64,
        )
        bi_d, bi_b = d[:n][valid], gb[codes]
    else:
        bi_d, bi_b = d[:0], np.empty(0, np.int64)
    return np.concatenate([uni_d, bi_d]), np.concatenate([uni_b, bi_b])


def dsir_importance(
    sf_dir: str, target_lang: str = "en", mode: str = "simple"
) -> ray.data.Dataset:
    """DSIR data-selection importance weights (Xie et al. 2023): score
    every document by how much more likely its hashed n-gram features are
    under the TARGET distribution (here: the ``lang == target_lang``
    slice) than under the raw corpus distribution.

    Features are unigram + bigram occurrences hashed into
    ``DSIR_BUCKETS`` buckets; both distributions are Laplace-smoothed
    bucket frequencies; a document's log importance weight is
    sum over its gram occurrences of log2 p_target(b) - log2 p_raw(b).
    Rows: (doc_id, n_grams, logw_sum, logw_avg), token-less docs omitted.

    Scale shape: pass 1 emits per-batch bucket-count partials (<= 2 x
    DSIR_BUCKETS ints per batch — feature-hashing collapses the vocab to a
    FIXED width, which is DSIR's whole point at corpus scale); the fold is
    a driver np.add.at over (buckets,) arrays; the weight table broadcast
    once; pass 2 is a stateless scoring map.  No shuffle at all.
    """
    import ray

    from .text import docs_dataset

    nb = DSIR_BUCKETS
    norm = TokenNormalizer(mode)

    def partials(batch: pa.Table) -> pa.Table:
        d, b = _dsir_gram_buckets(batch, norm, nb)
        if len(d) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "c_raw": pa.array([], pa.int64()),
                    "c_tgt": pa.array([], pa.int64()),
                }
            )
        is_tgt = (
            batch["lang"].to_numpy(zero_copy_only=False) == target_lang
        )[d]
        c_raw = np.bincount(b, minlength=nb)
        c_tgt = np.bincount(b[is_tgt], minlength=nb)
        nz = np.flatnonzero(c_raw)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "c_raw": pa.array(c_raw[nz], pa.int64()),
                "c_tgt": pa.array(c_tgt[nz], pa.int64()),
            }
        )

    parts = (
        docs_dataset(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(partials, batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    c_raw = np.zeros(nb, np.int64)
    c_tgt = np.zeros(nb, np.int64)
    if len(parts):
        bpos = parts["bucket"].to_numpy()
        np.add.at(c_raw, bpos, parts["c_raw"].to_numpy())
        np.add.at(c_tgt, bpos, parts["c_tgt"].to_numpy())
    t_raw, t_tgt = int(c_raw.sum()), int(c_tgt.sum())
    w = np.log2((c_tgt + 1.0) / np.float64(t_tgt + nb)) - np.log2(
        (c_raw + 1.0) / np.float64(t_raw + nb)
    )
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        wt = _ray.get(w_ref)
        d, b = _dsir_gram_buckets(batch, norm, nb)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "logw_sum": pa.array([], pa.float64()),
                "logw_avg": pa.array([], pa.float64()),
            }
        )
        if len(d) == 0:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(batch)
        # per-(doc, bucket) occurrence counts, then n * w — the same
        # summation structure the SQL oracle groups by
        key = d.astype(np.int64) * nb + b
        ukey, cnt = np.unique(key, return_counts=True)
        udoc = ukey // nb
        ub = ukey % nb
        n_grams = np.bincount(udoc, weights=cnt, minlength=n).astype(np.int64)
        slw = np.bincount(udoc, weights=cnt * wt[ub], minlength=n)
        mask = n_grams > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[mask], pa.int64()),
                "n_grams": pa.array(n_grams[mask], pa.int64()),
                "logw_sum": pa.array(slw[mask], pa.float64()),
                "logw_avg": pa.array(slw[mask] / n_grams[mask], pa.float64()),
            }
        )

    return (
        docs_dataset(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(score, batch_format="pyarrow", batch_size=512)
        .sort("doc_id")
    )


def dsir_importance_sql_oracle(
    target_lang: str = "en", nb: int = DSIR_BUCKETS
) -> str:
    return f"""
        WITH arr AS (
          SELECT doc_id, lang,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        uni AS (SELECT doc_id, lang, unnest(toks) AS gram FROM arr),
        bi AS (
          SELECT doc_id, lang,
                 unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                        i -> toks[i] || ' ' || toks[i+1])) AS gram
          FROM arr
        ),
        g AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        h AS (
          SELECT doc_id, lang,
                 CAST(concat('0x', substr(md5(gram), 1, 8)) AS BIGINT) % {nb} AS b
          FROM g
        ),
        cnt AS (
          SELECT b, count(*) AS c_raw,
                 sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS c_tgt
          FROM h GROUP BY b
        ),
        tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM cnt),
        lr AS (
          SELECT b, log2((c_tgt + 1.0) / (t_tgt + {nb}))
                    - log2((c_raw + 1.0) / (t_raw + {nb})) AS w
          FROM cnt CROSS JOIN tot
        ),
        per AS (SELECT doc_id, b, count(*) AS n FROM h GROUP BY doc_id, b)
        SELECT per.doc_id,
               CAST(sum(per.n) AS BIGINT) AS n_grams,
               sum(per.n * lr.w) AS logw_sum,
               sum(per.n * lr.w) / sum(per.n) AS logw_avg
        FROM per JOIN lr USING (b)
        GROUP BY per.doc_id ORDER BY per.doc_id
    """


# ----------------------------------------------------- Naive Bayes lang ----

_NB_SCALE = 1_000_000


def nb_lang_classify(sf_dir: str, mode: str = "simple") -> pa.Table:
    """Distributed multinomial Naive Bayes: TRAIN per-(term, lang) counts
    over the corpus, then CLASSIFY every document and emit the confusion
    matrix (true_lang, predicted, n) — a full train + inference pipeline
    with an exactly-matching SQL oracle.

    Cross-engine float determinism (the centroid_classify trick): the
    Laplace-smoothed log-probability ln((cnt+1)/(tot+V)) is quantized per
    (term, lang) — lq = floor(ln(..)*1e6 + 0.5) — BEFORE any summation, so
    a document's score Σ tf·lq is pure int64 arithmetic (order-free) and
    argmax (ties: ascending lang) matches SQL bit-for-bit.

    Shape: training is one task-based term shuffle (``util.hash_groupby``)
    producing the (term, lang, cnt) model — the broadcast small side;
    classification is a stateless scan emitting L×L confusion partials
    per batch.  Token-less documents are skipped (mirrors the oracle's
    inner join).
    """
    from ..functions.tokenize import doc_term_tf
    from ..util import hash_groupby

    norm = TokenNormalizer(mode)

    def count_partial(batch: pa.Table) -> pa.Table:
        d, tid, tf, vocab = doc_term_tf(batch["text"], norm)
        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(d) == 0:
            return empty
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        ul, lid_of_doc = np.unique(langs, return_inverse=True)
        key = tid.astype(np.int64) * len(ul) + lid_of_doc[d]
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, weights=tf).astype(np.int64)
        return pa.table(
            {
                "term": pa.array([vocab[k] for k in (uk // len(ul))], pa.string()),
                "lang": pa.array(ul[(uk % len(ul))], pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by(["term", "lang"], use_threads=False).aggregate(
            [("cnt", "sum")]
        )
        return g.rename_columns(["term", "lang", "cnt"])

    model = hash_groupby(
        docs_dataset(sf_dir, ["doc_id", "text", "lang"]).map_batches(
            count_partial, batch_format="pyarrow", batch_size=1024
        ),
        keys=["term"],
        finalize=fin,
    ).to_pandas()

    vocab = np.sort(model["term"].unique())
    langs = np.sort(model["lang"].unique())
    V, L = len(vocab), len(langs)
    cnt = np.zeros((V, L), np.int64)
    vi = np.searchsorted(vocab, model["term"].to_numpy())
    li = np.searchsorted(langs, model["lang"].to_numpy())
    cnt[vi, li] = model["cnt"].to_numpy()
    tot = cnt.sum(axis=0)
    lq = np.floor(
        np.log((cnt + 1.0) / (tot + V)[None, :]) * _NB_SCALE + 0.5
    ).astype(np.int64)
    model_ref = ray.put((vocab, langs, lq))

    def classify(batch: pa.Table) -> pa.Table:
        vv, ll, q = ray.get(model_ref)
        d, tid, tf, bvocab = doc_term_tf(batch["text"], norm)
        empty = pa.table(
            {
                "true_lang": pa.array([], pa.string()),
                "predicted": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(d) == 0:
            return empty
        gid = np.searchsorted(vv, np.asarray(bvocab))  # all terms trained
        scores = np.zeros((len(batch), len(ll)), np.int64)
        np.add.at(scores, d, tf[:, None] * q[gid[tid]])
        n_tok = np.bincount(d, weights=tf, minlength=len(batch))
        has = n_tok > 0
        pred = np.argmax(scores, axis=1)  # first max == ascending-lang tie
        true = batch["lang"].to_numpy(zero_copy_only=False)
        tl, tinv = np.unique(true[has], return_inverse=True)
        key = tinv * len(ll) + pred[has]
        uk, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "true_lang": pa.array(tl[uk // len(ll)], pa.string()),
                "predicted": pa.array(ll[uk % len(ll)], pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        docs_dataset(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(classify, batch_format="pyarrow", batch_size=1024)
        .to_pandas()
    )
    agg = (
        parts.groupby(["true_lang", "predicted"], as_index=False)["n"]
        .sum()
        .sort_values(["true_lang", "predicted"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "true_lang": pa.array(agg["true_lang"], pa.string()),
            "predicted": pa.array(agg["predicted"], pa.string()),
            "n": pa.array(agg["n"].astype("int64"), pa.int64()),
        }
    )


def nb_lang_sql_oracle() -> str:
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        tc AS (
          SELECT t.term, d.lang, CAST(count(*) AS BIGINT) AS cnt
          FROM t JOIN documents d USING (doc_id) GROUP BY t.term, d.lang
        ),
        v AS (SELECT DISTINCT term FROM t),
        langs AS (SELECT DISTINCT lang FROM documents),
        tot AS (SELECT lang, sum(cnt) AS tot FROM tc GROUP BY lang),
        nv AS (SELECT count(*) AS v FROM v),
        lq AS (
          SELECT v.term, l.lang,
                 CAST(floor(ln((coalesce(tc.cnt, 0) + 1.0)
                              / (tot.tot + nv.v)) * {_NB_SCALE} + 0.5)
                      AS BIGINT) AS lq
          FROM v CROSS JOIN langs l
          LEFT JOIN tc ON tc.term = v.term AND tc.lang = l.lang
          JOIN tot ON tot.lang = l.lang
          CROSS JOIN nv
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        sc AS (
          SELECT tf.doc_id, lq.lang, sum(tf.tf * lq.lq) AS score
          FROM tf JOIN lq USING (term) GROUP BY tf.doc_id, lq.lang
        ),
        pred AS (
          SELECT doc_id, lang AS predicted FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                     PARTITION BY doc_id ORDER BY score DESC, lang ASC
                   ) AS rn
            FROM sc
          ) WHERE rn = 1
        )
        SELECT d.lang AS true_lang, p.predicted, CAST(count(*) AS BIGINT) AS n
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.predicted
        ORDER BY true_lang, predicted
    """
