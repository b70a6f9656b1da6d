"""Training-data curation operators — repetition stats, regex redaction,
quality-filter flags, deterministic stratified sampling.

These are the standard curation passes of a large-scale LLM-data pipeline
(C4/Gopher-style heuristics; Lee et al. dedup pipelines run them first),
expressed as stateless Arrow batch transforms so they stream at 100 TB:
no shuffle at all — every op is embarrassingly parallel per document, and
each stage's regexes/normalizers are compiled once per actor in
``__init__``.  Every output column is an exact integer (counts, 0/1
flags, hash buckets) or a hash string, so the DuckDB oracle comparison is
deterministic — same contract as `text.py`.

Token semantics are the frozen ``simple`` tokenizer
(``regexp_split_to_array(lower(text), '[^a-z0-9]+')``), identical to the
rest of the oracle-checked suite.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.minhash import md5_strings
from ..functions.tokenize import TokenNormalizer, doc_term_tf, tokenize_batch
from ..util import stage_fn
from .text import STOPWORDS, docs_dataset

# ---------------------------------------------------------------------------
# repetition stats (Gopher-style duplicated / dominant n-gram signals)
# ---------------------------------------------------------------------------


class RepetitionStage:
    """batch -> (doc_id, n_tokens, n_bigrams, top_bigram_count, n_trigrams,
    distinct_trigrams) — integer repetition signals per document.

    ``top_bigram_count`` is the occurrence count of the document's most
    frequent token bigram (the Gopher "fraction of characters in the most
    common 2-gram" signal, kept as exact integers so the oracle hash is
    deterministic); ``n_trigrams - distinct_trigrams`` is the duplicated
    trigram mass.  Vectorized: grams are packed (doc, t0, t1[, t2]) integer
    keys and counted with one np.unique per gram order; the only Python
    loop is over batches, never rows.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.norm = TokenNormalizer("simple")

    def _gram_stats(
        self, d: np.ndarray, tid: np.ndarray, order: int, n_docs: int, v: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(occurrences, distinct, top_count) per doc for token n-grams."""
        occ = np.zeros(n_docs, np.int64)
        distinct = np.zeros(n_docs, np.int64)
        top = np.zeros(n_docs, np.int64)
        if len(d) < order:
            return occ, distinct, top
        # a gram spans rows [i, i+order) of the same doc
        mask = d[: len(d) - order + 1] == d[order - 1 :]
        if not mask.any():
            return occ, distinct, top
        # packed key: (((doc*v)+t0)*v+t1)... — fits int64 for any batch the
        # engine produces; recurse on halves if a pathological vocab wouldn't
        if float(n_docs) * float(v) ** order >= float(2**62):
            raise ValueError("gram key overflow — reduce batch_size")
        idx = np.flatnonzero(mask)
        key = d[idx].astype(np.int64)
        for j in range(order):
            key = key * v + tid[idx + j]
        uniq, counts = np.unique(key, return_counts=True)
        gdoc = (uniq // (v**order)).astype(np.int64)
        occ = np.bincount(d[idx], minlength=n_docs).astype(np.int64)
        distinct = np.bincount(gdoc, minlength=n_docs).astype(np.int64)
        # segment max of counts per doc (uniq is sorted, so gdoc is grouped)
        starts = np.flatnonzero(np.diff(gdoc, prepend=-1))
        top[gdoc[starts]] = np.maximum.reduceat(counts, starts)
        return occ, distinct, top

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, vocab = tokenize_batch(batch[self.text_col], self.norm)
        n = len(batch)
        v = max(len(vocab), 1)
        n_tokens = np.bincount(d, minlength=n).astype(np.int64)
        bg_occ, _, bg_top = self._gram_stats(d, tid, 2, n, v)
        tg_occ, tg_distinct, _ = self._gram_stats(d, tid, 3, n, v)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens),
                "n_bigrams": pa.array(bg_occ),
                "top_bigram_count": pa.array(bg_top),
                "n_trigrams": pa.array(tg_occ),
                "distinct_trigrams": pa.array(tg_distinct),
            }
        )


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(RepetitionStage), batch_format="pyarrow", batch_size=512
    )


def repetition_stats_sql_oracle() -> str:
    return """
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        bg AS (
          SELECT doc_id, toks[u.i] || ' ' || toks[u.i+1] AS g
          FROM arr, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
        ),
        tg AS (
          SELECT doc_id, toks[u.i] || ' ' || toks[u.i+1] || ' ' || toks[u.i+2] AS g
          FROM arr, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS u(i)
        ),
        bstat AS (
          SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                 CAST(max(c) AS BIGINT) AS top_bigram_count
          FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
          GROUP BY doc_id
        ),
        tstat AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS distinct_trigrams,
                 CAST(sum(c) AS BIGINT) AS n_trigrams
          FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2)
          GROUP BY doc_id
        )
        SELECT a.doc_id, CAST(len(a.toks) AS BIGINT) AS n_tokens,
               coalesce(b.n_bigrams, 0) AS n_bigrams,
               coalesce(b.top_bigram_count, 0) AS top_bigram_count,
               coalesce(t.n_trigrams, 0) AS n_trigrams,
               coalesce(t.distinct_trigrams, 0) AS distinct_trigrams
        FROM arr a
        LEFT JOIN bstat b ON a.doc_id = b.doc_id
        LEFT JOIN tstat t ON a.doc_id = t.doc_id
    """


# ---------------------------------------------------------------------------
# regex redaction (PII-style scrub)
# ---------------------------------------------------------------------------

# applied in this order; Python re and DuckDB's RE2 agree byte-for-byte on
# these ASCII patterns (no lookarounds, explicit classes)
EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_PAT = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
# a corpus-matching pattern so the oracle row is non-trivial on the driver
# tables (their synthetic docs contain no emails/IPs)
TERM_PAT = "\\b(?:key|hash)\\b"


class RedactStage:
    """batch -> (doc_id, n_emails, n_ipv4, n_terms, redacted_sha256).

    Counts each pattern on the original text, then applies the replacements
    in fixed order (EMAIL -> <EMAIL>, IPV4 -> <IP>, TERM -> <TOK>) and
    emits sha256 of the scrubbed text — the downstream pipeline consumes
    the hash-keyed scrubbed corpus without ever re-shipping raw text.
    Regexes compile once per actor.
    """

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.email = re.compile(EMAIL_PAT)
        self.ipv4 = re.compile(IPV4_PAT)
        self.term = re.compile(TERM_PAT)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n_em = np.empty(len(texts), np.int64)
        n_ip = np.empty(len(texts), np.int64)
        n_tm = np.empty(len(texts), np.int64)
        shas = []
        for i, t in enumerate(texts):
            n_em[i] = len(self.email.findall(t))
            n_ip[i] = len(self.ipv4.findall(t))
            n_tm[i] = len(self.term.findall(t))
            red = self.term.sub(
                "<TOK>", self.ipv4.sub("<IP>", self.email.sub("<EMAIL>", t))
            )
            shas.append(hashlib.sha256(red.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pa.array(n_em),
                "n_ipv4": pa.array(n_ip),
                "n_terms": pa.array(n_tm),
                "redacted_sha256": pa.array(shas, pa.string()),
            }
        )


def redact_pii(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(RedactStage), batch_format="pyarrow", batch_size=1024
    )


def redact_pii_sql_oracle() -> str:
    def q(p: str) -> str:
        return p.replace("'", "''")

    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{q(EMAIL_PAT)}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{q(IPV4_PAT)}')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(text, '{q(TERM_PAT)}')) AS BIGINT) AS n_terms,
               sha256(regexp_replace(regexp_replace(regexp_replace(text,
                   '{q(EMAIL_PAT)}', '<EMAIL>', 'g'),
                   '{q(IPV4_PAT)}', '<IP>', 'g'),
                   '{q(TERM_PAT)}', '<TOK>', 'g')) AS redacted_sha256
        FROM documents
    """


# ---------------------------------------------------------------------------
# quality-filter flags (C4/Gopher-style keep/drop decision, exact integers)
# ---------------------------------------------------------------------------

LEN_LO, LEN_HI = 20, 100_000  # token-count bounds
TTR_PCTx100 = 15  # type-token ratio >= 0.15
WLEN_LO, WLEN_HI = 3, 10  # mean token length in [3, 10]


class QualityFilterStage:
    """batch -> per-doc integer stats + 0/1 flags + the keep decision.

    Flags (all integer arithmetic, no float thresholds):
      len_ok     LEN_LO <= n_tokens <= LEN_HI
      uniq_ok    100 * n_unique >= TTR_PCTx100 * n_tokens
      stop_ok    at least one stopword present (C4's "has common words")
      wordlen_ok WLEN_LO * n_tokens <= token_chars <= WLEN_HI * n_tokens
      keep       all of the above
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.norm = TokenNormalizer("simple")

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        n = len(batch)
        tlen = np.array([len(v) for v in vocab], dtype=np.int64)
        stop = np.array([v in STOPWORDS for v in vocab], dtype=np.int64)
        n_tokens = np.bincount(d, weights=tf, minlength=n).astype(np.int64)
        n_unique = np.bincount(d, minlength=n).astype(np.int64)
        token_chars = np.bincount(d, weights=tf * tlen[tid], minlength=n).astype(np.int64)
        stop_count = np.bincount(d, weights=tf * stop[tid], minlength=n).astype(np.int64)
        len_ok = ((n_tokens >= LEN_LO) & (n_tokens <= LEN_HI)).astype(np.int64)
        uniq_ok = (100 * n_unique >= TTR_PCTx100 * n_tokens).astype(np.int64)
        stop_ok = (stop_count >= 1).astype(np.int64)
        wordlen_ok = (
            (token_chars >= WLEN_LO * n_tokens) & (token_chars <= WLEN_HI * n_tokens)
        ).astype(np.int64)
        keep = len_ok * uniq_ok * stop_ok * wordlen_ok
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens),
                "n_unique": pa.array(n_unique),
                "len_ok": pa.array(len_ok),
                "uniq_ok": pa.array(uniq_ok),
                "stop_ok": pa.array(stop_ok),
                "wordlen_ok": pa.array(wordlen_ok),
                "keep": pa.array(keep),
            }
        )


def quality_filter(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(QualityFilterStage), batch_format="pyarrow", batch_size=1024
    )


def quality_filter_sql_oracle() -> str:
    stop_sql = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        s AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(count(DISTINCT term) AS BIGINT) AS n_unique,
                 CAST(sum(length(term)) AS BIGINT) AS token_chars,
                 CAST(sum(CASE WHEN term IN {stop_sql} THEN 1 ELSE 0 END) AS BIGINT)
                   AS stop_count
          FROM t GROUP BY doc_id
        ),
        -- documents LEFT JOIN so token-less docs still get a row (the engine
        -- emits every doc; bincount gives them all-zero stats, keep = 0)
        s0 AS (
          SELECT d.doc_id,
                 coalesce(s.n_tokens, 0) AS n_tokens,
                 coalesce(s.n_unique, 0) AS n_unique,
                 coalesce(s.token_chars, 0) AS token_chars,
                 coalesce(s.stop_count, 0) AS stop_count
          FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        ),
        f AS (
          SELECT doc_id, n_tokens, n_unique,
                 CASE WHEN n_tokens BETWEEN {LEN_LO} AND {LEN_HI}
                      THEN 1 ELSE 0 END AS len_ok,
                 CASE WHEN 100 * n_unique >= {TTR_PCTx100} * n_tokens
                      THEN 1 ELSE 0 END AS uniq_ok,
                 CASE WHEN stop_count >= 1 THEN 1 ELSE 0 END AS stop_ok,
                 CASE WHEN token_chars BETWEEN {WLEN_LO} * n_tokens
                                           AND {WLEN_HI} * n_tokens
                      THEN 1 ELSE 0 END AS wordlen_ok
          FROM s0
        )
        SELECT doc_id, n_tokens, n_unique,
               CAST(len_ok AS BIGINT) AS len_ok,
               CAST(uniq_ok AS BIGINT) AS uniq_ok,
               CAST(stop_ok AS BIGINT) AS stop_ok,
               CAST(wordlen_ok AS BIGINT) AS wordlen_ok,
               CAST(len_ok * uniq_ok * stop_ok * wordlen_ok AS BIGINT) AS keep
        FROM f
    """


# ---------------------------------------------------------------------------
# deterministic stratified sampling (per-group hash-bernoulli)
# ---------------------------------------------------------------------------

# per-language keep rates (percent) — the "domain mixing" knob of a
# training-data pipeline; deterministic in doc_id, so re-runs and resumed
# jobs sample the identical subset with zero coordination
SAMPLE_RATES = {"de": 25, "en": 60, "es": 25, "fr": 25, "zh": 10}
DEFAULT_RATE = 20


class StratifiedSampleStage:
    """batch -> kept rows (doc_id, lang, bucket).

    bucket = high-32-bits of md5(str(doc_id)) mod 100 — bit-identical to
    DuckDB's ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
    % 100, so the sample is SQL-verifiable.  Keep iff bucket < rate[lang].
    """

    def __init__(self):
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_pylist()
        h = md5_strings([str(int(i)) for i in ids], self._cache)
        bucket = ((h >> np.uint64(32)) % np.uint64(100)).astype(np.int64)
        rates = np.fromiter(
            (SAMPLE_RATES.get(l, DEFAULT_RATE) for l in langs),
            dtype=np.int64,
            count=len(langs),
        )
        keep = bucket < rates
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "lang": pa.array([l for l, k in zip(langs, keep) if k], pa.string()),
                "bucket": pa.array(bucket[keep]),
            }
        )


def stratified_sample(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "lang"]).map_batches(
        stage_fn(StratifiedSampleStage), batch_format="pyarrow", batch_size=4096
    )


def stratified_sample_sql_oracle() -> str:
    rate_case = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(SAMPLE_RATES.items())
    )
    return f"""
        WITH b AS (
          SELECT doc_id, lang,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                      % 100 AS BIGINT) AS bucket,
                 (CASE lang {rate_case} ELSE {DEFAULT_RATE} END) AS rate
          FROM documents
        )
        SELECT doc_id, lang, bucket FROM b WHERE bucket < rate
    """


# ---------------------------------------------------------------------------
# benchmark decontamination (eval-set n-gram overlap)
# ---------------------------------------------------------------------------

DECONTAM_MOD = 13          # doc_id % 13 == 0 -> the "benchmark" split
DECONTAM_NGRAM = 3
DECONTAM_THRESHOLD = 10    # flag docs with >= 10% of distinct grams in bench


class _DocGrams:
    """batch -> per-doc DISTINCT token n-gram hashes, segment-encoded.

    Shared by both decontamination passes; grams are FNV-combined rolling
    windows over the frozen ``simple`` tokenizer, identical semantics to
    the ngram_jaccard ops (docs shorter than n emit no grams, matching the
    SQL ``range()`` producing an empty list)."""

    def __init__(self, n: int = DECONTAM_NGRAM):
        self.n = n
        self.norm = TokenNormalizer("simple")

    def doc_grams(self, batch: pa.Table):
        from ..functions import minhash as mh

        d, tid, vocab = tokenize_batch(batch["text"], self.norm)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        vhash = mh.hash_strings(vocab)
        th = vhash[tid] if len(tid) else np.empty(0, np.uint64)
        starts = np.searchsorted(d, np.arange(len(batch)))
        ends = np.searchsorted(d, np.arange(len(batch)), side="right")
        out, out_ids = [], []
        for i in range(len(batch)):
            toks = th[starts[i] : ends[i]]
            if len(toks) < self.n:
                continue
            out.append(np.unique(mh.shingle_hashes(toks, k=self.n)))
            out_ids.append(ids[i])
        return out_ids, out


class _BenchGramStage(_DocGrams):
    """Benchmark split only: emit its distinct gram hashes (for the
    driver-side union — the eval set is small BY NATURE, that asymmetry is
    what makes decontamination broadcastable at 100 TB)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        batch = batch.take(pa.array(np.flatnonzero(ids % DECONTAM_MOD == 0)))
        _, grams = self.doc_grams(batch)
        u = (
            np.unique(np.concatenate(grams))
            if grams
            else np.empty(0, np.uint64)
        )
        return pa.table({"gram": pa.array(u.view(np.int64))})


class _ContaminationStage(_DocGrams):
    """Non-benchmark docs: count distinct grams hitting the broadcast
    benchmark set -> (doc_id, n_grams, hits, contamination_pct)."""

    def __init__(self, bench_ref):
        super().__init__()
        self.bench = ray.get(bench_ref)  # sorted uint64, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        batch = batch.take(pa.array(np.flatnonzero(ids % DECONTAM_MOD != 0)))
        out_ids, grams = self.doc_grams(batch)
        rows = {"doc_id": [], "n_grams": [], "hits": [], "contamination_pct": []}
        for did, g in zip(out_ids, grams):
            pos = np.searchsorted(self.bench, g)
            pos[pos >= len(self.bench)] = 0
            hits = int((self.bench[pos] == g).sum()) if len(self.bench) else 0
            if 100 * hits >= DECONTAM_THRESHOLD * len(g):
                rows["doc_id"].append(int(did))
                rows["n_grams"].append(len(g))
                rows["hits"].append(hits)
                rows["contamination_pct"].append(100 * hits // len(g))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in rows.items()}
        )


def _bench_gram_set(sf_dir: str) -> np.ndarray:
    """Distinct eval-split gram hashes, sorted uint64 (driver-side union —
    small by nature: the eval split is a fixed fraction of the corpus)."""
    bench = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_BenchGramStage), batch_format="pyarrow",
            batch_size=1024,
        )
        .to_pandas()["gram"]
        .to_numpy()
    )
    return np.unique(bench.view(np.uint64))


def decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Flag training documents contaminated by the benchmark split.

    The standard pre-training decontamination pass (GPT-3 App. C / Dolma):
    docs whose distinct token 3-grams overlap the eval set's gram set by
    >= DECONTAM_THRESHOLD% are flagged with exact integer evidence columns.  Two streaming
    passes, NO shuffle: the benchmark grams (small by nature) are unioned
    on the driver and broadcast once via ``ray.put``; the corpus scan is
    one ``map_batches`` with a per-actor ``searchsorted`` membership probe.
    """
    bench_ref = ray.put(_bench_gram_set(sf_dir))
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_ContaminationStage, bench_ref),
        batch_format="pyarrow",
        batch_size=1024,
    )


def decontaminate_sql_oracle() -> str:
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - {DECONTAM_NGRAM - 1}, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
          FROM arr
        ),
        bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_MOD} = 0),
        scan AS (
          SELECT doc_id, count(*) AS n_grams,
                 count(*) FILTER (WHERE gram IN (SELECT gram FROM bench)) AS hits
          FROM g WHERE doc_id % {DECONTAM_MOD} <> 0 GROUP BY doc_id
        )
        SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
               CAST(hits AS BIGINT) AS hits,
               CAST((100 * hits) // n_grams AS BIGINT) AS contamination_pct
        FROM scan WHERE 100 * hits >= {DECONTAM_THRESHOLD} * n_grams
    """


# ---------------------------------------------------------------------------
# end-to-end curation pipeline with a partitioned parquet sink
# ---------------------------------------------------------------------------


class _CurateKeysStage(QualityFilterStage):
    """batch -> (doc_id, lang, sha, bucket, q_keep): one text pass emitting
    the quality verdict plus the dedup key (sha256) and the sample key
    (md5 bucket, same rule as ``StratifiedSampleStage``)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = super().__call__(batch)
        sha = [
            hashlib.sha256(s.encode()).hexdigest()
            for s in batch[self.text_col].to_pylist()
        ]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = md5_strings([str(int(i)) for i in ids])
        bucket = ((h >> np.uint64(32)) % np.uint64(100)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "sha": pa.array(sha, pa.string()),
                "bucket": pa.array(bucket, pa.int64()),
                "q_keep": q["keep"],
            }
        )


def curate_corpus(sf_dir: str, out_dir: str | None = None) -> pa.Table:
    """End-to-end curation: quality filter -> exact dedup (first-seen-wins
    among quality survivors) -> stratified sample -> partitioned parquet
    sink.  Returns the per-language funnel counts (lang, n_input,
    n_quality, n_dedup, n_kept) — the SQL-checkable contract.

    Pipeline shape at 100 TB: ONE text pass computes the slim key table
    (id, lang, sha, bucket, flag — no text), which is materialized once so
    the counts and the dedup groupby don't re-tokenize; keeper selection is
    one sha-bucket shuffle (``util.hash_groupby``); every count is a
    per-batch partial fold.  The sink re-reads only the winning docs
    (broadcast sorted-id filter here; a doc_id-bucketed hash join once the
    curated set outgrows a broadcast) and writes ``lang=<l>/`` partition
    directories — the layout a resuming caller needs to re-run only the
    partitions that are missing (this function itself always writes a
    fresh sink: the default /tmp scratch dir is recycled, a caller-supplied
    ``out_dir`` must not already exist)."""
    import shutil

    import pyarrow.compute as pc

    from ..util import hash_groupby, stage_fn

    keys = (
        docs_dataset(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(
            stage_fn(_CurateKeysStage), batch_format="pyarrow", batch_size=1024
        )
        .materialize()  # slim (no text); reused by counts + dedup below
    )

    def lang_counts(t: pa.Table, cols: dict[str, str]) -> pa.Table:
        df = t.to_pandas().groupby("lang", as_index=False).agg(**cols)
        return pa.Table.from_pandas(df, preserve_index=False)

    inq = (
        keys.map_batches(
            lambda t: lang_counts(
                t, {"n_input": ("doc_id", "size"), "n_quality": ("q_keep", "sum")}
            ),
            batch_format="pyarrow",
            batch_size=8192,
        )
        .to_pandas()
        .groupby("lang", as_index=False)
        .sum()
    )

    qual = keys.map_batches(
        lambda t: t.filter(pc.equal(t["q_keep"], 1)), batch_format="pyarrow"
    )

    def pick_min(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .sort_values(["sha", "doc_id"])
            .groupby("sha", as_index=False)
            .first()
        )
        return pa.Table.from_pandas(
            df[["doc_id", "lang", "bucket"]], preserve_index=False
        )

    keepers = hash_groupby(qual, ["sha"], pick_min)

    def sample_filter(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        rates = np.fromiter(
            (SAMPLE_RATES.get(l, DEFAULT_RATE) for l in langs),
            dtype=np.int64,
            count=len(langs),
        )
        b = t["bucket"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(b < rates))

    ded = (
        keepers.map_batches(
            lambda t: lang_counts(t, {"n_dedup": ("doc_id", "size")}),
            batch_format="pyarrow",
            batch_size=8192,
        )
        .to_pandas()
        .groupby("lang", as_index=False)
        .sum()
    )
    sampled = keepers.map_batches(sample_filter, batch_format="pyarrow")
    sdf = sampled.to_pandas()  # the final curated id set (rate-bounded)

    if out_dir is None:
        # default scratch sink: ours to recycle between runs
        base = os.path.basename(os.path.normpath(sf_dir))
        out_dir = f"/tmp/index_ray_curated_{base}"
        shutil.rmtree(out_dir, ignore_errors=True)
    elif os.path.exists(out_dir):
        # never delete a caller-supplied directory; partition dirs from a
        # partial run are the caller's to inspect or clean
        raise FileExistsError(
            f"curate_corpus sink {out_dir!r} already exists; remove it or "
            "pass a fresh path"
        )
    ids_ref = ray.put(np.sort(sdf["doc_id"].to_numpy(np.int64)))

    def keep_docs(t: pa.Table) -> pa.Table:
        s = ray.get(ids_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(s) == 0:
            return t.slice(0, 0)
        pos = np.searchsorted(s, ids)
        pos[pos >= len(s)] = 0
        return t.filter(pa.array(s[pos] == ids))

    docs_dataset(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        keep_docs, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["lang"])

    import pandas as pd

    kep = (
        sdf.groupby("lang", as_index=False)
        .agg(n_kept=("doc_id", "size"))
        if len(sdf)
        else pd.DataFrame({"lang": [], "n_kept": []})
    )
    out = (
        inq.merge(ded, on="lang", how="left")
        .merge(kep, on="lang", how="left")
        .fillna(0)
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_input": pa.array(out["n_input"].astype(np.int64), pa.int64()),
            "n_quality": pa.array(out["n_quality"].astype(np.int64), pa.int64()),
            "n_dedup": pa.array(out["n_dedup"].astype(np.int64), pa.int64()),
            "n_kept": pa.array(out["n_kept"].astype(np.int64), pa.int64()),
        }
    )


def curate_corpus_sql_oracle() -> str:
    stop_sql = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    rate_case = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(SAMPLE_RATES.items())
    )
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        s AS (
          SELECT doc_id, count(*) AS n_tokens, count(DISTINCT term) AS n_unique,
                 sum(length(term)) AS token_chars,
                 sum(CASE WHEN term IN {stop_sql} THEN 1 ELSE 0 END) AS stop_count
          FROM t GROUP BY doc_id
        ),
        s0 AS (
          SELECT d.doc_id, d.lang, d.text,
                 coalesce(s.n_tokens, 0) AS n_tokens,
                 coalesce(s.n_unique, 0) AS n_unique,
                 coalesce(s.token_chars, 0) AS token_chars,
                 coalesce(s.stop_count, 0) AS stop_count
          FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        ),
        q AS (
          SELECT doc_id, lang, sha256(text) AS sha,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                   % 100 AS bucket,
                 (CASE WHEN n_tokens BETWEEN {LEN_LO} AND {LEN_HI} THEN 1 ELSE 0 END)
                 * (CASE WHEN 100 * n_unique >= {TTR_PCTx100} * n_tokens THEN 1 ELSE 0 END)
                 * (CASE WHEN stop_count >= 1 THEN 1 ELSE 0 END)
                 * (CASE WHEN token_chars BETWEEN {WLEN_LO} * n_tokens
                                              AND {WLEN_HI} * n_tokens
                         THEN 1 ELSE 0 END) AS keep
          FROM s0
        ),
        keepers AS (
          SELECT min(doc_id) AS doc_id FROM q WHERE keep = 1 GROUP BY sha
        )
        SELECT q.lang,
               CAST(count(*) AS BIGINT) AS n_input,
               CAST(sum(q.keep) AS BIGINT) AS n_quality,
               CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dedup,
               CAST(sum(CASE WHEN k.doc_id IS NOT NULL
                              AND q.bucket < (CASE q.lang {rate_case}
                                              ELSE {DEFAULT_RATE} END)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM q LEFT JOIN keepers k ON q.doc_id = k.doc_id
        GROUP BY q.lang
    """


# ---------------------------------------------------------------------------
# exactly-k uniform sample (mergeable bottom-k sketch)
# ---------------------------------------------------------------------------

UNIFORM_SAMPLE_K = 200


def uniform_sample(sf_dir: str, k: int = UNIFORM_SAMPLE_K) -> pa.Table:
    """Exactly-k uniform sample without replacement: the k documents with
    the smallest md5 hash priority.

    A bottom-k sketch is MERGEABLE — bottom-k of a union is the bottom-k
    of the parts' bottom-ks — so each batch emits at most k (doc_id,
    priority) rows and one driver merge finishes (a tree merge at cluster
    scale); unlike rate-based hash-bernoulli sampling
    (``stratified_sample``) the output size is exact, not expected.
    Deterministic in doc_id: priority is the same md5 prefix DuckDB
    computes as ``('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1,
    16))::UBIGINT``, so the oracle is ORDER BY priority LIMIT k."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pr = md5_strings([str(int(i)) for i in ids])
        if len(ids) > k:
            sel = np.argpartition(pr, k)[:k]
            ids, pr = ids[sel], pr[sel]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "priority": pa.array(pr, pa.uint64()),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        # tree-fold level: bottom-k over ~64 partial bottom-ks per task,
        # bounding the driver's final fold at cluster scale
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pr = batch["priority"].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            sel = np.argpartition(pr, k)[:k]
            ids, pr = ids[sel], pr[sel]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "priority": pa.array(pr, pa.uint64()),
            }
        )

    parts = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=1024)
        .map_batches(fold, batch_format="pyarrow", batch_size=64 * k)
        .to_pandas()
    )
    ids = parts["doc_id"].to_numpy(np.int64)
    pr = parts["priority"].to_numpy(np.uint64)
    if len(pr) > k:
        sel = np.argpartition(pr, k)[:k]
        ids, pr = ids[sel], pr[sel]
    order = np.argsort(pr, kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "priority": pa.array(pr[order], pa.uint64()),
        }
    )


def uniform_sample_sql_oracle(k: int = UNIFORM_SAMPLE_K) -> str:
    return f"""
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                 AS priority
        FROM documents
        ORDER BY priority, doc_id LIMIT {k}
    """



GROUP_SAMPLE_K = 50


def _g_bottomk(g: np.ndarray, ids: np.ndarray, pr: np.ndarray, k: int) -> np.ndarray:
    """Indices of the bottom-k (priority, doc_id) rows WITHIN each group —
    vectorized: factorize + lexsort + within-run rank."""
    import pandas as pd

    codes, _ = pd.factorize(g)
    order = np.lexsort((ids, pr, codes))
    c2 = codes[order]
    starts = np.concatenate([[0], np.flatnonzero(c2[1:] != c2[:-1]) + 1])
    lens = np.diff(np.concatenate([starts, [len(c2)]]))
    rank = np.arange(len(c2)) - np.repeat(starts, lens)
    return order[rank < k]


def group_sample(
    sf_dir: str, k: int = GROUP_SAMPLE_K, by: str = "lang"
) -> pa.Table:
    """Exactly-k-per-stratum sample without replacement: within each group
    the k documents with the smallest md5 hash priority — the per-domain /
    per-language quota draw a mixture-balanced training set needs (where
    ``stratified_sample`` keeps an expected RATE, this keeps an exact
    COUNT per stratum).

    Bottom-k per group is mergeable exactly like the global bottom-k
    (``uniform_sample``): each batch emits at most n_groups * k rows, a
    tree-fold level re-folds ~64 partials per task, and the driver
    finishes on a bounded table.  Deterministic in doc_id (same md5
    priority the DuckDB oracle computes)."""
    empty = pa.table(
        {
            by: pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "priority": pa.array([], pa.uint64()),
        }
    )

    def bottomk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        g = batch[by].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if "priority" in batch.column_names:
            pr = batch["priority"].to_numpy(zero_copy_only=False)
        else:
            pr = md5_strings([str(int(i)) for i in ids])
        sel = _g_bottomk(g, ids, pr, k)
        return pa.table(
            {
                by: pa.array(g[sel]),
                "doc_id": pa.array(ids[sel], pa.int64()),
                "priority": pa.array(pr[sel], pa.uint64()),
            }
        )

    parts = (
        docs_dataset(sf_dir, ["doc_id", by])
        .map_batches(bottomk, batch_format="pyarrow", batch_size=1024)
        .map_batches(bottomk, batch_format="pyarrow", batch_size=64 * k)
        .to_arrow_refs()
    )
    t = pa.concat_tables(ray.get(parts))
    if t.num_rows == 0:
        return empty
    g = t[by].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    pr = t["priority"].to_numpy(zero_copy_only=False)
    sel = _g_bottomk(g, ids, pr, k)
    order = sel[np.lexsort((pr[sel], g[sel].astype(str)))]
    return pa.table(
        {
            by: pa.array(g[order]),
            "doc_id": pa.array(ids[order], pa.int64()),
            "priority": pa.array(pr[order], pa.uint64()),
        }
    )


def group_sample_sql_oracle(k: int = GROUP_SAMPLE_K, by: str = "lang") -> str:
    return f"""
        WITH h AS (
          SELECT {by}, doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
                   AS priority
          FROM documents
        )
        SELECT {by}, doc_id, priority FROM (
          SELECT *, row_number() OVER (
                      PARTITION BY {by} ORDER BY priority, doc_id) AS rn
          FROM h
        ) WHERE rn <= {k}
        ORDER BY {by}, priority
    """


def group_topk(
    sf_dir: str, k: int = 3, by: str = "lang", score: str = "n_chars"
) -> pa.Table:
    """Ranked top-k per group: within each ``by`` stratum the k documents
    with the LARGEST ``score`` (ties broken by smallest doc_id), with the
    explicit 1-based rank — ``row_number() OVER (PARTITION BY by ORDER BY
    score DESC, doc_id) <= k`` as a distributed window operator.

    Same mergeable per-group bottom-k shape as ``group_sample`` (each batch
    emits at most n_groups * k rows; a tree-fold level re-folds ~64 partials
    per task; the driver finishes on a bounded table) with priority =
    -score, so the all-to-all a window-rank normally needs never happens —
    only candidate top-k rows move.  Output: (by, rank, doc_id, score).
    """
    empty = pa.table(
        {
            by: pa.array([], pa.string()),
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            score: pa.array([], pa.int64()),
        }
    )

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty.drop_columns(["rank"])
        g = batch[by].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sc = batch[score].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = _g_bottomk(g, ids, -sc, k)
        return pa.table(
            {
                by: pa.array(g[sel]),
                "doc_id": pa.array(ids[sel], pa.int64()),
                score: pa.array(sc[sel], pa.int64()),
            }
        )

    parts = (
        docs_dataset(sf_dir, ["doc_id", by, score])
        .map_batches(topk, batch_format="pyarrow", batch_size=4096)
        .map_batches(topk, batch_format="pyarrow", batch_size=64 * k)
        .to_arrow_refs()
    )
    t = pa.concat_tables(ray.get(parts), promote_options="default")
    if t.num_rows == 0:
        return empty
    g = t[by].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    sc = t[score].to_numpy(zero_copy_only=False)
    sel = _g_bottomk(g, ids, -sc, k)
    # 1-based rank within each surviving group, in (score DESC, doc_id) order
    import pandas as pd

    codes, _ = pd.factorize(g[sel])
    order = np.lexsort((ids[sel], -sc[sel], codes))
    c2 = codes[order]
    starts = np.concatenate([[0], np.flatnonzero(c2[1:] != c2[:-1]) + 1])
    lens = np.diff(np.concatenate([starts, [len(c2)]]))
    rank = np.arange(len(c2)) - np.repeat(starts, lens) + 1
    o = sel[order]
    return pa.table(
        {
            by: pa.array(g[o]),
            "rank": pa.array(rank, pa.int64()),
            "doc_id": pa.array(ids[o], pa.int64()),
            score: pa.array(sc[o], pa.int64()),
        }
    )


def group_topk_sql_oracle(
    k: int = 3, by: str = "lang", score: str = "n_chars"
) -> str:
    return f"""
        SELECT {by}, CAST(rn AS BIGINT) AS rank, doc_id, {score} FROM (
          SELECT {by}, doc_id, {score},
                 row_number() OVER (
                   PARTITION BY {by} ORDER BY {score} DESC, doc_id) AS rn
          FROM documents
        ) WHERE rn <= {k}
    """


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (the sharded-eval-set scale path)
# ---------------------------------------------------------------------------

# ~1.2% false-positive rate at 10 bits/key with 4 probes; FPs only cost an
# extra exact-confirm lookup, they can never change the output.
BLOOM_BITS_PER_KEY = 10
BLOOM_K = 4


def _bloom_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two avalanched 64-bit hashes per key (Kirsch-Mitzenmacher double
    hashing: probe_i = h1 + i*h2).  h2 is forced odd so with a power-of-two
    table every probe lands on a distinct slot."""
    from .sketches import _splitmix64

    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
    return h1, h2


def bloom_build(keys: np.ndarray) -> tuple[np.ndarray, np.uint64]:
    """Bloom bitmap (uint64 words) + slot mask over a uint64 key set.

    m = next power of two >= BLOOM_BITS_PER_KEY * n slots.  All array ops
    keep the numpy array on the LEFT (this host's scalar-dispatch path is
    pathologically slow, see BENCH/BASELINE.md)."""
    n = max(int(len(keys)), 1)
    m = 1 << max(6, int(np.ceil(np.log2(n * BLOOM_BITS_PER_KEY))))
    words = np.zeros(m >> 6, np.uint64)
    mask = np.uint64(m - 1)
    h1, h2 = _bloom_hashes(keys)
    ones = np.ones(len(keys), np.uint64)
    for i in range(BLOOM_K):
        idx = (h1 + h2 * np.uint64(i)) & mask
        np.bitwise_or.at(
            words,
            (idx >> np.uint64(6)).astype(np.int64),
            ones << (idx & np.uint64(63)),
        )
    return words, mask


def bloom_probe(
    words: np.ndarray, mask: np.uint64, keys: np.ndarray
) -> np.ndarray:
    """Vectorized membership test.  True may be a false positive; False is
    never wrong (zero false negatives by construction)."""
    hit = np.ones(len(keys), bool)
    h1, h2 = _bloom_hashes(keys)
    for i in range(BLOOM_K):
        idx = (h1 + h2 * np.uint64(i)) & mask
        w = words[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= ((w >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
        if not hit.any():
            break
    return hit


class _BloomContaminationStage(_DocGrams):
    """`_ContaminationStage` with a Bloom prefilter: every gram is probed
    against the broadcast bitmap first, and only bloom-positive grams are
    confirmed against the exact sorted set — so the output is row-identical
    to the exact stage (the bitmap only prunes confirm work, never flips a
    verdict).

    Why this is the 100 TB shape: a multi-benchmark eval gram set can reach
    1e9+ distinct grams — 8+ GB resident per worker as raw sorted uint64,
    but ~BLOOM_BITS_PER_KEY/64 of that (~1.25 GB) as a bitmap — and clean
    documents (the overwhelming majority) short-circuit after the bitmap
    probe without touching the exact set at all.  At that scale the
    exact-confirm side becomes a gram-range-sharded fetch instead of this
    broadcast; the two-tier bitmap->confirm shape is unchanged."""

    def __init__(self, bloom_ref, bench_ref):
        super().__init__()
        self.words, self.mask = ray.get(bloom_ref)
        self.bench = ray.get(bench_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_np = batch["doc_id"].to_numpy(zero_copy_only=False)
        batch = batch.take(
            pa.array(np.flatnonzero(ids_np % DECONTAM_MOD != 0))
        )
        out_ids, grams = self.doc_grams(batch)
        rows = {"doc_id": [], "n_grams": [], "hits": [], "contamination_pct": []}
        if out_ids:
            flat = np.concatenate(grams)
            lens = np.fromiter((len(g) for g in grams), np.int64, len(grams))
            offs = np.concatenate(([0], np.cumsum(lens)))
            pos_mask = bloom_probe(self.words, self.mask, flat)
            for j, (did, g) in enumerate(zip(out_ids, grams)):
                m = pos_mask[offs[j] : offs[j + 1]]
                if not m.any():  # clean doc: bitmap-only, no exact lookups
                    continue
                cand = g[m]
                pos = np.searchsorted(self.bench, cand)
                pos[pos >= len(self.bench)] = 0
                hits = (
                    int((self.bench[pos] == cand).sum())
                    if len(self.bench)
                    else 0
                )
                if 100 * hits >= DECONTAM_THRESHOLD * len(g):
                    rows["doc_id"].append(int(did))
                    rows["n_grams"].append(len(g))
                    rows["hits"].append(hits)
                    rows["contamination_pct"].append(100 * hits // len(g))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def decontaminate_bloom(sf_dir: str) -> ray.data.Dataset:
    """`decontaminate` through the Bloom two-tier scale path — identical
    output (same rows, same integer evidence), checked by the same SQL
    oracle; pytest additionally pins row-identity to the exact pass."""
    bench = _bench_gram_set(sf_dir)
    bloom_ref = ray.put(bloom_build(bench))
    bench_ref = ray.put(bench)
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_BloomContaminationStage, bloom_ref, bench_ref),
        batch_format="pyarrow",
        batch_size=1024,
    )


# ---------------------------------------------------------------------------
# domain mixing (epoch-weighted upsampling per source)
# ---------------------------------------------------------------------------

# target epochs per source in PERCENT (250 = 2.5 epochs, 40 = 0.4, 100 = 1x)
MIX_EPOCHS_PCT = {"src0": 250, "src1": 40, "src2": 0}
MIX_DEFAULT_PCT = 100


class _EpochMixStage:
    """batch -> (doc_id, source, copy) repeated per the source's epoch
    weight: floor(e/100) whole copies plus one more iff the doc's md5
    bucket < e%100 — deterministic fractional upsampling, so the mixture
    is exactly reproducible shard-by-shard (and SQL-verifiable)."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        srcs = batch["source"].to_pylist()
        h = md5_strings([str(int(i)) for i in ids], self._cache)
        bucket = ((h >> np.uint64(32)) % np.uint64(100)).astype(np.int64)
        epct = np.fromiter(
            (MIX_EPOCHS_PCT.get(s, MIX_DEFAULT_PCT) for s in srcs),
            dtype=np.int64,
            count=len(srcs),
        )
        copies = epct // 100 + (bucket < epct % 100)
        idx = np.repeat(np.arange(len(ids)), copies)
        starts = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(copies[:-1], out=starts[1:])
        copy_no = np.arange(len(idx)) - np.repeat(starts, copies)
        return pa.table(
            {
                "doc_id": pa.array(ids[idx], pa.int64()),
                "source": pa.array([srcs[i] for i in idx], pa.string()),
                "copy": pa.array(copy_no, pa.int64()),
            }
        )


def epoch_mix(sf_dir: str) -> ray.data.Dataset:
    """Training-mixture materialization: upsample/downsample each source to
    its target epoch count.  (doc_id, source, copy); copy enumerates the
    repeats so a downstream shuffle can interleave epochs.  Pure streaming
    map (no shuffle); the mixture proportions are exact in expectation and
    deterministic given doc_id."""
    return docs_dataset(sf_dir, ["doc_id", "source"]).map_batches(
        stage_fn(_EpochMixStage), batch_format="pyarrow", batch_size=4096
    )


def epoch_mix_sql_oracle() -> str:
    case = " ".join(
        f"WHEN '{s}' THEN {p}" for s, p in sorted(MIX_EPOCHS_PCT.items())
    )
    return f"""
        WITH e AS (
          SELECT doc_id, source,
                 (CASE source {case} ELSE {MIX_DEFAULT_PCT} END) AS epct,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                      % 100 AS BIGINT) AS bucket
          FROM documents
        )
        SELECT doc_id, source, CAST(u.c AS BIGINT) AS copy
        FROM e, unnest(range(0, epct // 100 +
                 (CASE WHEN bucket < epct % 100 THEN 1 ELSE 0 END))) u(c)
    """


# ---------------------------------------------------------------------------
# sequence packing (concat-and-chunk training-sequence layout)
# ---------------------------------------------------------------------------

SEQ_LEN = 2048  # tokens per training sequence (frozen for the oracle row)
_WS_TOKEN = "[^ \\t\\n\\r\\f\\v]+"  # whitespace-token regex (RE2 == DuckDB)


def sequence_pack(sf_dir: str, seq_len: int = SEQ_LEN) -> ray.data.Dataset:
    """GPT-style sequence packing: concatenate all documents in doc_id
    order and chunk the token stream into ``seq_len``-token training
    sequences; report where each document lands.

    (doc_id, n_tokens, tok_start, seq_first, seq_last) for every document
    with >= 1 whitespace token: ``tok_start`` is the document's exclusive
    global token offset, ``seq_first``/``seq_last`` the first/last training
    sequence it occupies.  The global offset is a distributed two-phase
    scan (``util.ordered_prefix_sum``): one narrow (doc_id, n_tokens) sort
    — the only all-to-all, over 16-byte rows — then per-block sums, driver
    cumsum of one int per block, and independent per-block rewrites.  The
    downstream writer can emit each sequence range from whichever shard
    holds it; docs crossing a boundary (seq_first < seq_last) are the
    packing-efficiency signal.
    """
    import pyarrow.compute as pc

    from ..util import ordered_prefix_sum

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], _WS_TOKEN).cast(pa.int64())
        t = pa.table({"doc_id": batch["doc_id"], "n_tokens": n})
        return t.filter(pc.greater(t["n_tokens"], 0))

    toks = docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        counts, batch_format="pyarrow"
    )
    scanned = ordered_prefix_sum(toks, "doc_id", "n_tokens", "tok_start")

    def spans(batch: pa.Table) -> pa.Table:
        start = batch["tok_start"].to_numpy()
        n = batch["n_tokens"].to_numpy()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": batch["n_tokens"],
                "tok_start": batch["tok_start"],
                "seq_first": pa.array(start // seq_len, pa.int64()),
                "seq_last": pa.array((start + n - 1) // seq_len, pa.int64()),
            }
        )

    return scanned.map_batches(spans, batch_format="pyarrow")


def sequence_pack_sql_oracle(seq_len: int = SEQ_LEN) -> str:
    return f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '{_WS_TOKEN}')) AS BIGINT)
                   AS n_tokens
          FROM documents
        ),
        p AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS tok_start
          FROM t WHERE n_tokens > 0
        )
        SELECT doc_id, n_tokens, tok_start,
               tok_start // {seq_len} AS seq_first,
               (tok_start + n_tokens - 1) // {seq_len} AS seq_last
        FROM p
    """


CHUNK_W = 128  # tokens per retrieval chunk (frozen for the oracle row)
CHUNK_S = 96  # stride between chunk starts (CHUNK_W - CHUNK_S tokens overlap)


def chunk_documents(
    sf_dir: str, window: int = CHUNK_W, stride: int = CHUNK_S
) -> ray.data.Dataset:
    """RAG-style sliding-window chunking layout: split each document's
    whitespace-token stream into ``window``-token chunks every ``stride``
    tokens (the standard overlapping-passage layout for retrieval corpora
    and long-context training).

    Output: (doc_id, chunk_id, start_tok, chunk_tokens) — one row per
    chunk; every document yields at least one chunk (a short or empty doc
    is one partial chunk), the last chunk always reaches the document's
    final token, and consecutive chunks overlap by ``window - stride``
    tokens.  Pure streaming map (token count + vectorized row expansion
    inside one ``map_batches``) — no shuffle, no driver state; at 100 TB
    the chunk table is produced shard-local next to each input block.
    """
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    import pyarrow.compute as pc

    def expand(batch: pa.Table) -> pa.Table:
        n = (
            pc.count_substring_regex(batch["text"], _WS_TOKEN)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_chunks = np.where(n <= window, 1, (n - window + stride - 1) // stride + 1)
        total = int(n_chunks.sum())
        rep_ids = np.repeat(ids, n_chunks)
        rep_n = np.repeat(n, n_chunks)
        offsets = np.cumsum(n_chunks) - n_chunks
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(offsets, n_chunks)
        start = chunk_id * stride
        ctoks = np.minimum(window, rep_n - start)
        return pa.table(
            {
                "doc_id": pa.array(rep_ids, pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "chunk_tokens": pa.array(ctoks, pa.int64()),
            }
        )

    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        expand, batch_format="pyarrow", batch_size=1024
    )


def chunk_documents_sql_oracle(
    window: int = CHUNK_W, stride: int = CHUNK_S
) -> str:
    return f"""
        WITH c AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '{_WS_TOKEN}')) AS BIGINT)
                   AS n
          FROM documents
        ),
        k AS (
          SELECT doc_id, n,
                 CASE WHEN n <= {window} THEN 1
                      ELSE (n - {window} + {stride} - 1) // {stride} + 1
                 END AS n_chunks
          FROM c
        ),
        e AS (
          SELECT doc_id, n,
                 unnest(generate_series(0, n_chunks - 1)) AS i
          FROM k
        )
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               CAST(i * {stride} AS BIGINT) AS start_tok,
               CAST(least({window}, n - i * {stride}) AS BIGINT)
                 AS chunk_tokens
        FROM e
    """


# ----------------------------------------------------------- hash split ----


def _split_assign(batch: pa.Table) -> pa.Table:
    """batch -> (split, doc_id, n_chars): md5-bucketed deterministic split.

    md5 of the decimal doc_id (not a seeded RNG) so the assignment is
    reproducible across engines, languages and reruns — the property a
    train/valid/test split must keep when the corpus is re-curated.
    """
    ids = batch["doc_id"].to_pylist()
    b = np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in ids),
        dtype=np.int64,
        count=len(ids),
    )
    split = np.where(b < 90, "train", np.where(b < 95, "valid", "test"))
    return pa.table(
        {
            "split": pa.array(split.tolist(), pa.string()),
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
        }
    )


def hash_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 90/5/5 train/valid/test split by content-stable hash —
    the standard "split by hash(id), never by position" rule that keeps a
    document in the same split across corpus versions.

    One row per split: (split, n_docs, sum_chars, sum_doc, min_doc,
    max_doc) — integer-exact summary (the per-doc assignment itself is the
    trivially-parallel map; the summary is what the oracle pins).  The
    assignment map is stateless and shuffle-free; the summary groupby
    collapses to 3 rows.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    return (
        docs_dataset(sf_dir, ["doc_id", "n_chars"])
        .map_batches(_split_assign, batch_format="pyarrow", batch_size=2048)
        .groupby("split")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Sum("doc_id", alias_name="sum_doc"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
        )
        .sort("split")
    )


# ---------------------------------------------------------------------------
# code-quality stats (The Stack / StarCoder-style source-file filters)
# ---------------------------------------------------------------------------

# Integer-exact thresholds (the published filters use max_line_length 1000,
# avg_line_length 100, alphanumeric fraction 0.25; the digit cap drops
# hex dumps / generated tables).  All checks are integer comparisons so the
# DuckDB oracle agrees bit-for-bit.
CODE_MAX_LINE_LEN = 1000
CODE_AVG_LINE_LEN = 100  # sum(line chars) <= 100 * n_lines
CODE_ALNUM_PCT = 25  # 100 * n_alnum >= 25 * n_chars
CODE_DIGIT_PCT = 50  # 100 * n_digit <= 50 * n_chars


class CodeStatsStage:
    """batch -> per-doc line/character stats + 0/1 flags + keep decision.

    The standard source-code pre-training filters (The Stack v1/v2,
    StarCoder): drop files with absurdly long lines (minified/generated),
    high digit share (hex dumps), or low alphanumeric share (binary-ish).
    Character counts are Unicode codepoints (== DuckDB ``length()``); line
    split is on bare ``\\n`` with DuckDB ``string_split`` semantics (empty
    text -> one empty line).  Stateless, shuffle-free, fully vectorized
    (three Arrow regex/count kernels + one reduceat for per-doc max).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(batch)
        n_chars = pc.utf8_length(text).to_numpy().astype(np.int64)
        n_alnum = pc.count_substring_regex(text, "[a-zA-Z0-9]").to_numpy().astype(np.int64)
        n_digit = pc.count_substring_regex(text, "[0-9]").to_numpy().astype(np.int64)
        sp = pc.split_pattern(text, "\n")
        line_counts = pc.list_value_length(sp).to_numpy().astype(np.int64)
        line_lens = pc.utf8_length(pc.list_flatten(sp)).to_numpy().astype(np.int64)
        # every doc splits to >= 1 line, so reduceat starts are all in-range
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(line_counts[:-1], out=starts[1:])
        max_line = (
            np.maximum.reduceat(line_lens, starts)
            if len(line_lens)
            else np.zeros(n, dtype=np.int64)
        )
        sum_line = n_chars - (line_counts - 1)  # chars minus the newlines
        line_ok = (
            (max_line <= CODE_MAX_LINE_LEN)
            & (sum_line <= CODE_AVG_LINE_LEN * line_counts)
        ).astype(np.int64)
        alnum_ok = (100 * n_alnum >= CODE_ALNUM_PCT * n_chars).astype(np.int64)
        digit_ok = (100 * n_digit <= CODE_DIGIT_PCT * n_chars).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": pa.array(line_counts),
                "max_line_len": pa.array(max_line.astype(np.int64)),
                "n_alnum": pa.array(n_alnum),
                "n_digit": pa.array(n_digit),
                "line_ok": pa.array(line_ok),
                "alnum_ok": pa.array(alnum_ok),
                "digit_ok": pa.array(digit_ok),
                "keep": pa.array(line_ok * alnum_ok * digit_ok),
            }
        )


def code_stats(sf_dir: str) -> ray.data.Dataset:
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(CodeStatsStage), batch_format="pyarrow", batch_size=2048
    )


def code_stats_sql_oracle() -> str:
    return f"""
        WITH l AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
                 CAST(list_max(list_transform(string_split(text, chr(10)),
                        x -> length(x))) AS BIGINT) AS max_line_len,
                 CAST(length(text)
                      - length(regexp_replace(text, '[a-zA-Z0-9]', '', 'g'))
                      AS BIGINT) AS n_alnum,
                 CAST(length(text)
                      - length(regexp_replace(text, '[0-9]', '', 'g'))
                      AS BIGINT) AS n_digit
          FROM documents
        ),
        f AS (
          SELECT doc_id, n_lines, max_line_len, n_alnum, n_digit,
                 CASE WHEN max_line_len <= {CODE_MAX_LINE_LEN}
                       AND n_chars - (n_lines - 1)
                           <= {CODE_AVG_LINE_LEN} * n_lines
                      THEN 1 ELSE 0 END AS line_ok,
                 CASE WHEN 100 * n_alnum >= {CODE_ALNUM_PCT} * n_chars
                      THEN 1 ELSE 0 END AS alnum_ok,
                 CASE WHEN 100 * n_digit <= {CODE_DIGIT_PCT} * n_chars
                      THEN 1 ELSE 0 END AS digit_ok
          FROM l
        )
        SELECT doc_id, n_lines, max_line_len, n_alnum, n_digit,
               CAST(line_ok AS BIGINT) AS line_ok,
               CAST(alnum_ok AS BIGINT) AS alnum_ok,
               CAST(digit_ok AS BIGINT) AS digit_ok,
               CAST(line_ok * alnum_ok * digit_ok AS BIGINT) AS keep
        FROM f
    """


def split_leakage(sf_dir: str) -> pa.Table:
    """Exact-duplicate leakage across the ``hash_split`` train/valid/test
    boundaries — the "is my eval set contaminated by byte-identical train
    documents" check every split pipeline should run.

    One row per eval split: (split, n_docs, n_leaked_docs) where a
    valid/test document is LEAKED when some train document has the
    identical text (sha256 equality, the same key ``exact_dedup`` groups
    by).

    Shape: one hash shuffle of (sha256, doc_id-split) rows; each content
    group decides has-train membership locally and emits per-split partial
    counts (2 ints per split per bucket), folded on the driver.
    """
    from ..util import hash_groupby

    def sha_split(batch: pa.Table) -> pa.Table:
        sha = [
            hashlib.sha256(s.encode()).hexdigest()
            for s in batch["text"].to_pylist()
        ]
        a = _split_assign(batch)
        return pa.table(
            {"content_sha256": pa.array(sha, pa.string()), "split": a["split"]}
        )

    def leak_partial(bucket: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "split": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_leaked_docs": pa.array([], pa.int64()),
            }
        )
        if bucket.num_rows == 0:
            return empty
        codes, _ = pd.factorize(
            bucket["content_sha256"].to_numpy(zero_copy_only=False)
        )
        split = bucket["split"].to_numpy(zero_copy_only=False)
        has_train = np.zeros(codes.max() + 1, bool)
        np.logical_or.at(has_train, codes, split == "train")
        rows = {"split": [], "n_docs": [], "n_leaked_docs": []}
        for name in ("test", "valid"):
            sel = split == name
            rows["split"].append(name)
            rows["n_docs"].append(int(sel.sum()))
            rows["n_leaked_docs"].append(int((sel & has_train[codes]).sum()))
        return pa.table(
            {
                "split": pa.array(rows["split"], pa.string()),
                "n_docs": pa.array(rows["n_docs"], pa.int64()),
                "n_leaked_docs": pa.array(rows["n_leaked_docs"], pa.int64()),
            }
        )

    src = docs_dataset(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        sha_split, batch_format="pyarrow"
    )
    parts = hash_groupby(src, ["content_sha256"], leak_partial).to_pandas()
    agg = (
        parts.groupby("split", as_index=False)[["n_docs", "n_leaked_docs"]]
        .sum()
        .sort_values("split")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "split": pa.array(agg["split"], pa.string()),
            "n_docs": pa.array(agg["n_docs"].astype("int64"), pa.int64()),
            "n_leaked_docs": pa.array(
                agg["n_leaked_docs"].astype("int64"), pa.int64()
            ),
        }
    )


def split_leakage_sql_oracle() -> str:
    return """
        WITH h AS (
          SELECT doc_id, sha256(text) AS s,
                 CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 AS b
          FROM documents
        ),
        sp AS (
          SELECT doc_id, s,
                 CASE WHEN b < 90 THEN 'train'
                      WHEN b < 95 THEN 'valid'
                      ELSE 'test' END AS split
          FROM h
        ),
        tr AS (SELECT DISTINCT s FROM sp WHERE split = 'train')
        SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN s IN (SELECT s FROM tr) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leaked_docs
        FROM sp WHERE split <> 'train'
        GROUP BY split ORDER BY split
    """


def quality_deciles(sf_dir: str) -> ray.data.Dataset:
    """Corpus-wide quality ranking: every document gets its global
    ``row_number()`` and ``ntile(10)`` decile by an integer quality score
    (token density: simple-tokens per 1000 chars) — the
    window-function-over-distributed-sort primitive
    (``util.global_row_number``): ONE range sort, one integer per block to
    the driver, then an independent per-block rewrite.  The ordering
    (q_milli DESC, doc_id ASC) is total, so ranks and deciles are
    deterministic and hash-comparable against SQL row_number/ntile.

    At 100 TB this is the shape a curriculum/quality-pruning pass needs:
    the sort is the one unavoidable all-to-all over a NARROW (doc_id,
    score) projection — document text never moves.
    """
    from ..util import global_row_number

    norm = TokenNormalizer("simple")

    def score(batch: pa.Table) -> pa.Table:
        d, _tid, _vocab = tokenize_batch(batch["text"], norm)
        n = len(batch)
        n_tok = np.bincount(d, minlength=n).astype(np.int64)
        n_chars = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.where(n_chars > 0, (1000 * n_tok) // np.maximum(n_chars, 1), 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "q_milli": pa.array(q.astype(np.int64), pa.int64()),
            }
        )

    ds = docs_dataset(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        score, batch_format="pyarrow", batch_size=1024
    )
    return global_row_number(
        ds,
        ["q_milli", "doc_id"],
        [True, False],
        out_col="rn",
        ntiles=10,
        tile_col="decile",
    )


def quality_deciles_sql_oracle() -> str:
    return """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        cnt AS (SELECT doc_id, count(*) AS n_tok FROM t GROUP BY doc_id),
        f AS (
          SELECT d.doc_id,
                 CASE WHEN d.n_chars > 0
                      THEN (1000 * coalesce(c.n_tok, 0)) // d.n_chars
                      ELSE 0 END AS q_milli
          FROM documents d LEFT JOIN cnt c USING (doc_id)
        )
        SELECT doc_id, CAST(q_milli AS BIGINT) AS q_milli,
               CAST(row_number() OVER (ORDER BY q_milli DESC, doc_id ASC) AS BIGINT) AS rn,
               CAST(ntile(10) OVER (ORDER BY q_milli DESC, doc_id ASC) AS BIGINT) AS decile
        FROM f
    """


WEIGHTED_SAMPLE_K = 100


def weighted_sample(sf_dir: str, k: int = WEIGHTED_SAMPLE_K) -> pa.Table:
    """Exactly-k sample WITHOUT replacement with probability proportional
    to document length — Efraimidis-Spirakis A-ES (one pass, mergeable):
    each doc draws a deterministic uniform u from its md5 and gets key
    ``ln(u) / n_chars``; the k LARGEST keys are the sample.

    Length-weighted sampling is how token-budgeted eval/calibration sets
    get drawn from a corpus (weight = token share).  Like
    ``uniform_sample``'s bottom-k, top-k-by-key is MERGEABLE, so each
    batch emits <= k rows, a tree fold bounds the driver's final merge at
    cluster scale, and nothing ever shuffles raw rows.  Zero-length docs
    carry zero weight and are excluded (the oracle's WHERE mirrors it).
    Determinism: u derives from md5(doc_id) exactly like DuckDB's
    ``('0x' || substr(md5(...), 1, 16))::UBIGINT``, so engine and oracle
    draw identical keys.
    """

    def keys_of(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = w > 0
        ids, w = ids[ok], w[ok]
        pr = md5_strings([str(int(i)) for i in ids])
        # u in (0,1): (h + 0.5) / 2^64; key = ln(u)/w, larger = better
        u = (pr.astype(np.float64) + 0.5) / 18446744073709551616.0
        return ids, np.log(u) / w

    def partial(batch: pa.Table) -> pa.Table:
        ids, key = keys_of(batch)
        if len(ids) > k:
            sel = np.argpartition(-key, k)[:k]
            ids, key = ids[sel], key[sel]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "key": pa.array(key, pa.float64())}
        )

    def fold(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        key = batch["key"].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            sel = np.argpartition(-key, k)[:k]
            ids, key = ids[sel], key[sel]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "key": pa.array(key, pa.float64())}
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=1024)
        .map_batches(fold, batch_format="pyarrow", batch_size=64 * k)
        .to_pandas()
    )
    ids = parts["doc_id"].to_numpy(np.int64)
    key = parts["key"].to_numpy(np.float64)
    if len(ids) > k:
        sel = np.argpartition(-key, k)[:k]
        ids, key = ids[sel], key[sel]
    order = np.lexsort((ids, -key))
    return pa.table({"doc_id": pa.array(ids[order], pa.int64())})


def weighted_sample_sql_oracle(k: int = WEIGHTED_SAMPLE_K) -> str:
    return f"""
        SELECT doc_id FROM (
          SELECT doc_id,
                 ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))
                          ::UBIGINT AS DOUBLE) + 0.5) / 18446744073709551616.0)
                   / CAST(n_chars AS DOUBLE) AS key
          FROM documents WHERE n_chars > 0
        )
        ORDER BY key DESC, doc_id LIMIT {k}
    """


DECONTAM_FUZZY_THRESHOLD = 60  # n-gram Jaccard % flagging a near-dup leak


def decontaminate_fuzzy(
    sf_dir: str, threshold_pct: int = DECONTAM_FUZZY_THRESHOLD
) -> pa.Table:
    """FUZZY decontamination: training documents that are NEAR-DUPLICATES
    of a benchmark document — the Dolma/FineWeb companion of the exact
    n-gram-overlap pass (:func:`decontaminate`): an eval answer lightly
    paraphrased into a train doc evades exact 13-gram membership but not
    document-level 3-gram Jaccard.  Same split convention (doc_id %
    DECONTAM_MOD == 0 is the benchmark side); output (doc_id, eval_doc,
    jaccard_pct) for every cross-split pair at or above the threshold,
    integer arithmetic so the SQL comparison is exact.

    Scale shape: per-gram buckets generate only CROSS pairs (train x
    eval within the bucket), so the quadratic blowup of a hot gram is
    train_count x EVAL_count — the eval side is small by nature, which
    is the whole reason this pass is tractable at 10^12 docs (the
    within-corpus analogue needs the banded LSH path,
    ``ngram_jaccard_lsh``).  One gram-bucket shuffle + one pair-count
    shuffle; per-doc gram counts are fetched only for docs appearing in
    a candidate pair (``dedup.jaccard_pairs_from_grams``), so driver
    state is pair-bounded.
    """
    from ..util import bounded_pair_dataset
    from .dedup import _GramEmit, jaccard_pairs_from_grams

    grams = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_GramEmit, DECONTAM_NGRAM, "simple"),
            batch_format="pyarrow",
            batch_size=256,
        )
        .materialize()  # consumed twice (pairs + sizes)
    )
    # bounded per-gram TRAIN x EVAL cross emit (util tile machinery with
    # the split as side_fn — a hot gram never materializes its whole
    # cross product in one group call)
    pair_ds = bounded_pair_dataset(
        grams, ["gram"], side_fn=_decontam_sides
    )
    out = jaccard_pairs_from_grams(grams, pair_ds, threshold_pct)
    return out.rename_columns(["doc_id", "eval_doc", "jaccard_pct"])


def _decontam_sides(ids: np.ndarray):
    """(train ids, eval ids) split for the fuzzy-decontamination cross
    join — eval docs are the ``doc_id % DECONTAM_MOD == 0`` holdout."""
    ev = ids % DECONTAM_MOD == 0
    return ids[~ev], ids[ev]


def decontaminate_fuzzy_sql_oracle(
    threshold_pct: int = DECONTAM_FUZZY_THRESHOLD,
) -> str:
    # quadratic cross-split baseline (the ngram_jaccard_dedup split)
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
          FROM arr
        ),
        sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        inter AS (
          SELECT gt.doc_id AS a, ge.doc_id AS b, count(*) AS inter
          FROM g gt JOIN g ge ON gt.gram = ge.gram
          WHERE gt.doc_id % {DECONTAM_MOD} <> 0
            AND ge.doc_id % {DECONTAM_MOD} = 0
          GROUP BY 1, 2
        )
        SELECT a AS doc_id, b AS eval_doc,
               CAST((100 * inter) // (sa.sz + sb.sz - inter) AS BIGINT) AS jaccard_pct
        FROM inter
        JOIN sz sa ON sa.doc_id = a
        JOIN sz sb ON sb.doc_id = b
        WHERE 100 * inter >= {threshold_pct} * (sa.sz + sb.sz - inter)
        ORDER BY doc_id, eval_doc
    """
