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
    sf_dir: str, mode: str = "simple", top_v: int | None = None
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

    Scale: the broadcast table is the corpus VOCABULARY (Zipf-collapsed,
    not corpus-sized); at 10^12-doc scale pass ``top_v`` to keep only the
    top-V terms by cf and score the tail at the OOV floor log2(1/total) —
    the exact full-vocab mode is the oracle-checked default.
    """
    import ray

    from .text import term_stats

    cf = term_stats(sf_dir).to_pandas()
    if len(cf) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "sum_log2p": pa.array([], pa.float64()),
                    "avg_log2p": pa.array([], pa.float64()),
                }
            )
        )
    total = int(cf["cf"].sum())
    floor = float(np.log2(1.0 / np.float64(total)))
    if top_v is not None:
        cf = cf.sort_values(["cf", "term"], ascending=[False, True]).head(top_v)
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


def lm_bigram_score(
    sf_dir: str, mode: str = "simple", top_b: int | None = None
) -> ray.data.Dataset:
    """Bigram-language-model document scoring — the KenLM-flavored step up
    from ``lm_score``: each document scores
    sum over its bigrams of log2 p(w2 | w1), with the MLE conditional
    p(w2 | w1) = count(w1 w2) / count(w1 as a left context) estimated on
    the corpus itself (so every in-document bigram has a probability; no
    backoff needed for the self-trained case).

    Pass 1 builds the distributed bigram count table (the existing
    ``bigram_counts`` partial-aggregate pipeline, unthresholded); the
    left-context totals and log-probabilities fold on the driver
    (vocabulary-sized, Zipf-collapsed) and broadcast once.  Pass 2 scores
    per document.  (doc_id, n_bigrams, sum_log2p, avg_log2p), documents
    with < 2 tokens omitted, sorted by doc_id.

    Scale: like ``lm_score``, pass ``top_b`` at 10^12 scale to broadcast
    only the top-B bigrams and score the tail at the floor
    log2(1/total_bigrams); the exact full-table mode is oracle-checked.
    """
    import ray

    from .text import bigram_counts

    cf = bigram_counts(sf_dir, min_count=1).to_pandas()
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "sum_log2p": pa.array([], pa.float64()),
            "avg_log2p": pa.array([], pa.float64()),
        }
    )
    if len(cf) == 0:
        return ray.data.from_arrow(empty)
    total = int(cf["cf"].sum())
    floor = float(np.log2(1.0 / np.float64(total)))
    w1 = cf["bigram"].str.split(" ", n=1).str[0]
    h = cf.groupby(w1)["cf"].transform("sum").to_numpy()
    lp = np.log2(cf["cf"].to_numpy().astype(np.float64) / h.astype(np.float64))
    if top_b is not None:
        keep = (
            cf.assign(_lp=lp)
            .sort_values(["cf", "bigram"], ascending=[False, True])
            .head(top_b)
        )
        logp = dict(zip(keep["bigram"], keep["_lp"]))
    else:
        logp = dict(zip(cf["bigram"], lp))
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
