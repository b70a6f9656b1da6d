"""Flagship pipeline + BM25-over-documents entries for the driver contract.

``flagship(sf_dir)``: build the full inverted index over the ``documents``
table (simple tokenizer so DuckDB can mirror it), then run the frozen
query set through the shard-actor BM25 engine; returns one table
(qid, rank, doc_id, score).

``bm25_topk(sf_dir)``: rank-only projection (qid, rank, doc_id) whose
DuckDB oracle recomputes BM25 end-to-end in SQL (same formula, SURVEY.md
§2.11) — the index build, varint round-trip, shuffle and scorer all sit on
this comparison path.

``index_terms(sf_dir)``: decode every posting block back out of the shard
parquet and re-aggregate (term, df, cf) — byte-level pack/unpack round
trip checked against plain SQL term stats.
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Sum

from ..functions import varint
from .build import BuildConfig, build_index
from .query import BM25Searcher

# frozen query term sets (already tokenized, unique, ascending) so the SQL
# oracle can inline them as VALUES
DOC_QUERIES: list[tuple[int, list[str], int]] = [
    (1, ["fast", "key", "merge", "sort"], 10),
    (2, ["group", "query", "spark"], 10),
    (3, ["customer", "filter", "stream"], 10),
    (4, ["scan", "table", "window"], 10),
    (5, ["nonexistentterm", "xyzzy"], 10),
]


# (qid, positive terms, excluded terms, k) — boolean NOT fixtures
NOT_QUERIES: list[tuple[int, list[str], list[str], int]] = [
    (1, ["fast", "key", "merge", "sort"], ["window"], 10),
    (2, ["group", "query", "spark"], ["customer"], 10),
    (3, ["scan", "table"], ["xyzzy"], 10),  # absent excluded term == plain OR
    (4, ["customer", "stream"], ["batch", "line"], 10),
]


PHRASES: list[tuple[int, str]] = [
    (1, "batch batch"),
    (2, "merge sort"),
    (3, "key order"),
    (4, "slow join"),
    (5, "xyzzy warp"),  # absent phrase: empty result path
]


def _index_dir_for(sf_dir: str) -> str:
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return f"/tmp/index_ray_docs_{key}"


def documents_index(sf_dir: str, positions: bool = False) -> str:
    """Build (or resume) the documents-table index; returns its directory."""
    out = _index_dir_for(sf_dir) + ("_pos" if positions else "")
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=16,
        batch_size=512,
        salt_docs=4096,
        positions=positions,
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    return out


def documents_head_index(sf_dir: str) -> str:
    """Build (or resume) the head_tokens=8 marker-namespace index shared
    by the head-boost / BM25F / dis_max queries; returns its directory."""
    out = _index_dir_for(sf_dir) + "_head"
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=16,
        batch_size=512,
        salt_docs=4096,
        head_tokens=8,
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    return out


def flagship(sf_dir: str) -> pa.Table:
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_many([(" ".join(terms), k) for _, terms, k in DOC_QUERIES])
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"])


def bm25_topk(sf_dir: str) -> pa.Table:
    """Rank-only BM25 results: (qid, rank, doc_id) — oracle-checkable."""
    return flagship(sf_dir).select(["qid", "rank", "doc_id"])


def bm25_scores(sf_dir: str) -> pa.Table:
    """Flagship result with integer-lifted scores: (qid, rank, doc_id,
    score_e6).  BM25 accumulates in float64 on both sides (engine and the
    DuckDB CTE oracle) and floor(score*1e6 + 0.5) — round-half-away for
    the positive scores — lifts them to hash-safe ints.  Caveat: SQL does
    not promise an accumulation ORDER for sum(), so the two float64 sums
    are equal empirically (ascending-term order on both sides in practice,
    pinned by every sweep), not by construction; a ~1-ulp difference
    landing exactly on an e6 boundary would shift one int by 1.  The
    boundary measure is ~1e-9 per value — accepted."""
    t = flagship(sf_dir)
    s = t["score"].to_numpy(zero_copy_only=False)
    e6 = np.floor(s * 1e6 + 0.5).astype(np.int64)
    return pa.table(
        {
            "qid": t["qid"],
            "rank": t["rank"],
            "doc_id": t["doc_id"],
            "score_e6": pa.array(e6, type=pa.int64()),
        }
    )


def bm25_and_topk(sf_dir: str) -> pa.Table:
    """Conjunctive BM25 top-k: only docs containing EVERY query term.

    Skip-seek posting intersection inside the shard actors (the reference's
    ``Seek`` extension point, ``/root/reference/index.h:141``); oracle is
    the same BM25 SQL with HAVING count(DISTINCT term) = n query terms.
    """
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES], mode="and"
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_not_topk(sf_dir: str) -> pa.Table:
    """BM25 top-k with boolean NOT: docs containing any excluded term are
    barred before ranking.  (qid, rank, doc_id); oracle anti-joins the
    excluded (qid, doc) membership off the scored set before the window."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, _, k in NOT_QUERIES],
        exclude=[" ".join(exc) for _, _, exc, _ in NOT_QUERIES],
    )
    tables = []
    for (qid, _, _, _), r in zip(NOT_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


# (qid, query with * wildcards, k) — prefix-expansion fixtures
PREFIX_QUERIES: list[tuple[int, str, int]] = [
    (1, "s* table", 10),
    (2, "qu* c*", 10),
    (3, "merge so*", 10),
    (4, "zzz*", 10),  # no lexicon term matches: empty result path
]


def bm25_prefix_topk(sf_dir: str) -> pa.Table:
    """Wildcard BM25 top-k: ``term*`` tokens expand via a sorted-lexicon
    range probe into an OR over every matching term (each with its own
    idf).  (qid, rank, doc_id); oracle expands the same prefixes with
    SQL LIKE over the distinct vocabulary."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_prefix_many([(q, k) for _, q, k in PREFIX_QUERIES])
    tables = []
    for (qid, _, _), r in zip(PREFIX_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_prefix_sql_oracle() -> str:
    pats = []
    for qid, q, _ in PREFIX_QUERIES:
        for tok in q.split():
            pat = tok[:-1].lower() + "%" if tok.endswith("*") else tok.lower()
            pats.append(f"({qid}, '{pat}')")
    values = ", ".join(pats)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
qp(qid, pat) AS (VALUES {values}),
q AS (SELECT DISTINCT qp.qid, df.term FROM qp JOIN df ON df.term LIKE qp.pat),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""


DELETE_MOD = 7  # doc_id % DELETE_MOD == 0 is tombstoned in the delete fixture


def bm25_after_delete(sf_dir: str) -> pa.Table:
    """Full delete lifecycle: build -> tombstone doc_id%7==0 -> compact
    (physical purge + lexicon/stats re-merge) -> BM25 top-k.

    (qid, rank, doc_id).  Post-compaction the index must be semantically
    identical to a from-scratch build over the remaining documents — the
    oracle recomputes BM25 (N, avgdl, df included) over that filtered
    corpus.
    """
    import shutil as _shutil

    from .compact import compact_index, delete_docs

    out = _index_dir_for(sf_dir) + "_del"
    marker = os.path.join(out, ".deleted_compacted")
    if not os.path.exists(marker):
        _shutil.rmtree(out, ignore_errors=True)
        cfg = BuildConfig(
            tokenizer="simple",
            text_col="text",
            id_col="doc_id",
            chunk_docs=250_000,
            num_parts=16,
            batch_size=512,
            salt_docs=4096,
        )
        build_index(f"{sf_dir}/documents.parquet", out, cfg)
        ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
            "doc_id"
        ].to_numpy(zero_copy_only=False)
        delete_docs(out, ids[ids % DELETE_MOD == 0])
        compact_index(out)
        with open(marker, "w") as fh:
            fh.write("1")
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_after_delete_sql_oracle() -> str:
    return (
        _bm25_ctes(doc_where=f"doc_id % {DELETE_MOD} <> 0")
        + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"
    )


def bm25_topk_meta(sf_dir: str) -> pa.Table:
    """BM25 top-k joined back to document metadata: (qid, rank, doc_id, lang).

    The reference's docID -> URL lookup (``getDocument``,
    ``/root/reference/index.cpp:16-19``) as a docmap join on the results.
    """
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES], meta_cols=["lang"]
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score", "lang"]).select(
        ["qid", "rank", "doc_id", "lang"]
    )


def bm25_facets(sf_dir: str) -> pa.Table:
    """Faceted search over the fixture queries: per query, how many
    documents match ANY query term, broken down by language — the
    Elasticsearch-style term-aggregation over the FULL match set (not the
    top-k), computed as shard-side bincounts against a resident
    docID -> facet map (``BM25Searcher.facet_counts``).

    (qid, facet, n_docs); a query matching nothing (qid 5's nonexistent
    terms) contributes no rows — the SQL oracle's join semantics.
    """
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.facet_counts(
        [" ".join(terms) for _, terms, _ in DOC_QUERIES], facet_col="lang"
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    return pa.concat_tables(tables)


def bm25_facets_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''),
        q(qid, term) AS (VALUES {values}),
        m AS (SELECT DISTINCT q.qid, t.doc_id FROM q JOIN t USING (term))
        SELECT m.qid, d.lang AS facet, count(*) AS n_docs
        FROM m JOIN documents d USING (doc_id)
        GROUP BY m.qid, d.lang
        ORDER BY m.qid, facet
    """


# More-Like-This fixtures: (qid, source doc_id).  doc_ids < 500 so the
# fixture resolves at every testdata scale factor.
MLT_SOURCES: list[tuple[int, int]] = [(1, 17), (2, 230), (3, 342)]
MLT_TERMS = 5  # query = the source doc's top-5 tf·idf terms
MLT_K = 10


def more_like_this(sf_dir: str) -> pa.Table:
    """Find-similar-documents (Lucene MoreLikeThis semantics): the query is
    the source document itself — its top ``MLT_TERMS`` terms by
    ``tf(t, src) · idf(t)`` (ties broken by term ASC) become a BM25 OR
    query, and the source document is excluded from the ranked result.

    Distribution shape: term selection is a driver-side probe (one doc's
    tf map × one resident-lexicon ``idf()`` lookup — O(|doc|), no corpus
    pass); the ranking itself runs through the same shard-actor scorer as
    every other BM25 entry.  The reference supports this implicitly via
    its exported statistics (A1–A4, ``/root/reference/index.h``): cf/df +
    per-doc tf are exactly the inputs MLT needs.
    """
    from collections import Counter

    import pyarrow.dataset as pads

    from ..functions.tokenize import split_tokens

    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    src_ids = [d for _, d in MLT_SOURCES]
    tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(src_ids)
    )
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    queries = []
    for _qid, did in MLT_SOURCES:
        toks = [t for t in split_tokens(pa.array([texts[did]]), "simple")[0].as_py() if t]
        tf = Counter(toks)
        dfidf = searcher.lexicon.idf(sorted(tf))
        ordered = sorted(((-(tf[t] * idf), t) for t, (_df, idf) in dfidf.items()))
        qterms = [t for _, t in ordered[:MLT_TERMS]]
        queries.append((" ".join(qterms), MLT_K + 1))  # +1: src doc slot
    results = searcher.search_many(queries)
    tables = []
    for (qid, did), r in zip(MLT_SOURCES, results):
        docs = r["docID"].to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(docs != did)[:MLT_K]
        rr = r.take(pa.array(keep))
        tables.append(
            pa.table(
                {
                    "qid": pa.array(np.full(len(rr), qid, dtype=np.int64)),
                    "rank": pa.array(np.arange(1, len(rr) + 1, dtype=np.int64)),
                    "doc_id": rr["docID"],
                }
            )
        )
    return pa.concat_tables(tables)


def more_like_this_sql_oracle() -> str:
    src_values = ", ".join(f"({qid}, {did})" for qid, did in MLT_SOURCES)
    return _corpus_ctes() + f""",
src(qid, src_doc) AS (VALUES {src_values}),
cand AS (
  SELECT src.qid, tf.term,
         tf.tf * ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) AS w
  FROM src
  JOIN tf ON tf.doc_id = src.src_doc
  JOIN df USING (term)
  CROSS JOIN stats
),
q AS (
  SELECT qid, term FROM (
    SELECT qid, term,
           row_number() OVER (PARTITION BY qid ORDER BY w DESC, term ASC) AS rn
    FROM cand
  ) WHERE rn <= {MLT_TERMS}
),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
kept AS (
  SELECT s.* FROM scored s JOIN src ON src.qid = s.qid
  WHERE s.doc_id <> src.src_doc
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM kept
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= {MLT_K}"""


def _corpus_ctes(doc_where: str = "") -> str:
    """Shared corpus CTEs: tokenize ``documents`` exactly like the engine's
    ``simple`` tokenizer (lower + split on ``[^a-z0-9]+``) and derive the
    BM25 statistic tables — per-doc term frequencies (``tf``), doc lengths
    (``dl``), corpus N/avgdl (``stats``) and document frequencies (``df``)."""
    where = f"WHERE {doc_where}" if doc_where else ""
    return f"""
WITH d0 AS (SELECT * FROM documents {where}),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM d0
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM d0) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM d0) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term)"""


def _bm25_ctes(
    conjunctive: bool = False,
    queries: list[tuple[int, list[str], int]] | None = None,
    exclude_map: dict[int, list[str]] | None = None,
    doc_where: str = "",
    min_match: int | None = None,
    fuzzy: bool = False,
) -> str:
    """Shared DuckDB CTEs recomputing BM25 from scratch; ``conjunctive``
    restricts scored docs to those matching every query term;
    ``min_match`` (mutually exclusive with conjunctive) restricts them to
    those matching at least that many distinct query terms;
    ``exclude_map`` (qid -> excluded terms) anti-joins excluded docs off
    the scored set before ranking (boolean NOT); ``doc_where`` (a SQL
    predicate) restricts the corpus itself — N, avgdl and df are computed
    over the restricted set (the post-compaction delete semantics)."""
    qlist = queries if queries is not None else DOC_QUERIES
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in qlist for t in terms
    )
    if fuzzy:
        q_cte = f"""q0(qid, term) AS (VALUES {values}),
q AS (
  SELECT DISTINCT q0.qid, v.term
  FROM q0 JOIN (SELECT DISTINCT term FROM t) v
    ON levenshtein(q0.term, v.term) <= 1
)"""
    else:
        q_cte = f"q(qid, term) AS (VALUES {values})"
    if conjunctive:
        having = (
            "HAVING count(DISTINCT tf.term) = "
            "(SELECT count(*) FROM q q2 WHERE q2.qid = q.qid)"
        )
    elif min_match is not None:
        having = f"HAVING count(DISTINCT tf.term) >= {min_match}"
    else:
        having = ""
    not_ctes = ""
    ranked_src = "scored"
    if exclude_map:
        xvalues = ", ".join(
            f"({qid}, '{t}')" for qid, terms in sorted(exclude_map.items()) for t in terms
        )
        not_ctes = f""",
xq(qid, term) AS (VALUES {xvalues}),
excluded AS (
  SELECT DISTINCT xq.qid, t.doc_id FROM xq JOIN t ON t.term = xq.term
),
kept AS (
  SELECT s.* FROM scored s
  LEFT JOIN excluded e ON e.qid = s.qid AND e.doc_id = s.doc_id
  WHERE e.doc_id IS NULL
)"""
        ranked_src = "kept"
    return _corpus_ctes(doc_where) + f""",
{q_cte},
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
  {having}
){not_ctes},
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM {ranked_src}
)"""


def bm25_sql_oracle() -> str:
    return _bm25_ctes() + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"


def bm25_scores_sql_oracle() -> str:
    """Same CTEs as bm25_sql_oracle but keeps the score, integer-lifted with
    the identical floor(x*1e6 + 0.5) rule the engine-side projection uses."""
    return _bm25_ctes() + """
SELECT r.qid, r.rank, r.doc_id,
       CAST(floor(s.score * 1000000 + 0.5) AS BIGINT) AS score_e6
FROM ranked r JOIN scored s ON s.qid = r.qid AND s.doc_id = r.doc_id
WHERE r.rank <= 10"""


LM_MU = 2000.0


def lm_dirichlet_topk(sf_dir: str) -> pa.Table:
    """Flagship queries ranked by query-likelihood Dirichlet LM scoring
    instead of BM25 — same index, same shards, different ranking model
    (``_score_chunk_lm`` holds the scoring contract; the reference
    hard-codes one ranker, this engine's postings serve both).  Output
    (qid, rank, doc_id, score_e6) with the same floor(x*1e6+0.5) integer
    lift as ``bm25_scores`` (same float-determinism caveat)."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_lm_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES], mu=LM_MU
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables).rename_columns(["qid", "rank", "doc_id", "score"])
    s = t["score"].to_numpy(zero_copy_only=False)
    e6 = np.floor(s * 1e6 + 0.5).astype(np.int64)
    return pa.table(
        {
            "qid": t["qid"],
            "rank": t["rank"],
            "doc_id": t["doc_id"],
            "score_e6": pa.array(e6, type=pa.int64()),
        }
    )


def lm_dirichlet_sql_oracle() -> str:
    """DuckDB recomputation of the Dirichlet LM contract from scratch:
    cf/C smoothing from the tokenized corpus, ln(1 + tf/((mu*cf)/C)) per
    matching term plus count(*)*ln(mu/(dl+mu)), identical float op order
    to ``_score_chunk_lm``."""
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    mu = LM_MU
    return _corpus_ctes() + f""",
q(qid, term) AS (VALUES {values}),
cf AS (SELECT term, count(*) AS cf FROM t GROUP BY term),
c AS (SELECT count(*) * 1.0 AS c FROM t),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(ln(1.0 + tf.tf / (({mu} * cf.cf) / c.c)))
         + count(*) * ln({mu} / (dl.dl + {mu})) AS score
  FROM q
  JOIN tf USING (term)
  JOIN cf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN c
  GROUP BY q.qid, tf.doc_id, dl.dl
),
ranked AS (
  SELECT qid, doc_id, score,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_e6
FROM ranked WHERE rank <= 10"""


# query-DSL fixtures: every clause type, incl. a phrase filter and an
# all-expansions-empty query (6)
DSL_QUERIES: list[tuple[int, str]] = [
    (1, "merge sort +fast -window"),
    (2, "group quer* spark"),
    (3, "+scan +table window"),
    (4, "customer filte~ stream"),
    (5, '"merge sort" key'),
    (6, "xyzzy* qqnothere~"),
]


def dsl_search(sf_dir: str) -> pa.Table:
    """The one-string user surface: each DSL fixture parsed and composed
    over the engine primitives by ``BM25Searcher.search_dsl`` (required
    AND filter, NOT channel, prefix/fuzzy expansion, positional phrase
    filter).  Runs on the positional documents index (fixture 5 needs
    phrases).  Output (qid, rank, doc_id)."""
    out = documents_index(sf_dir, positions=True)
    searcher = BM25Searcher(out)
    tables = []
    for qid, q in DSL_QUERIES:
        r = searcher.search_dsl(q, k=10)
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables).rename_columns(["qid", "rank", "doc_id", "score"])
    return t.select(["qid", "rank", "doc_id"])


def _sql_quote_list(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def dsl_search_sql_oracle() -> str:
    """Recompute every DSL fixture from scratch: the scored term set is a
    UNION of static terms, LIKE-prefix matches and levenshtein<=1 fuzzy
    matches over the corpus vocabulary; required terms gate via HAVING,
    exclusions anti-join, phrases filter via the same word-boundary regex
    as ``phrase_sql_oracle``."""
    from .query import parse_dsl

    per_qid = []
    for qid, q in DSL_QUERIES:
        spec = parse_dsl(q)
        static = sorted(
            {t.lower() for t in spec["opt"]} | {t.lower() for t in spec["req"]}
        )
        term_selects = []
        if static:
            term_selects.append(
                "SELECT term FROM (VALUES "
                + ", ".join(f"('{t}')" for t in static)
                + ") v(term)"
            )
        for p in spec["prefix"]:
            term_selects.append(
                f"SELECT DISTINCT term FROM t WHERE term LIKE '{p.lower()}%'"
            )
        for f in spec["fuzzy"]:
            term_selects.append(
                "SELECT DISTINCT term FROM t "
                f"WHERE levenshtein(term, '{f.lower()}') <= 1"
            )
        q_cte = " UNION ".join(term_selects) if term_selects else (
            "SELECT term FROM t WHERE 1 = 0"
        )
        req = sorted({t.lower() for t in spec["req"]})
        having = (
            "HAVING count(DISTINCT CASE WHEN tf.term IN "
            f"({_sql_quote_list(req)}) THEN tf.term END) = {len(req)}"
            if req
            else ""
        )
        where_parts = []
        exc = sorted({t.lower() for t in spec["exc"]})
        if exc:
            where_parts.append(
                "s.doc_id NOT IN (SELECT doc_id FROM t "
                f"WHERE term IN ({_sql_quote_list(exc)}))"
            )
        for ph in spec["phrases"]:
            toks = ph.lower().split()
            pat = "(^|[^a-z0-9])" + "[^a-z0-9]+".join(toks) + "([^a-z0-9]|$)"
            where_parts.append(
                "s.doc_id IN (SELECT doc_id FROM documents "
                f"WHERE regexp_matches(lower(text), '{pat}'))"
            )
        where = ("WHERE " + " AND ".join(where_parts)) if where_parts else ""
        per_qid.append(
            f"""
sel_{qid} AS (
  SELECT {qid} AS qid, doc_id, rank FROM (
    SELECT s.doc_id,
           CAST(row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS BIGINT) AS rank
    FROM (
      SELECT tf.doc_id,
             sum(
               ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             ) AS score
      FROM (SELECT DISTINCT term FROM ({q_cte})) q
      JOIN tf USING (term)
      JOIN df USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
      {having}
    ) s
    {where}
  ) WHERE rank <= 10
)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM sel_{qid}" for qid, _ in DSL_QUERIES)
    return (
        _corpus_ctes()
        + ","
        + ",".join(per_qid)
        + f"\nSELECT qid, rank, doc_id FROM ({union})"
    )


AUTOCOMPLETE_PREFIXES = ["s", "c", "qu", "zz"]  # 'zz': empty-result path
AUTOCOMPLETE_K = 5


def autocomplete(sf_dir: str) -> pa.Table:
    """Search-box autocomplete: for each prefix, the top-``K`` completions
    from the index vocabulary ranked by collection frequency (cf DESC,
    term ASC) — the suggest surface every search platform bolts onto its
    lexicon.  The candidate range comes from the merged lexicon's sorted
    term order (``Lexicon.prefix_terms``: bisect on the resident map /
    row-group-pruned range read at scale); cf joins from the same
    lexicon.  Output (prefix, rank, term, cf)."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    rows_p: list[str] = []
    rows_r: list[int] = []
    rows_t: list[str] = []
    rows_c: list[int] = []
    for p in AUTOCOMPLETE_PREFIXES:
        terms = searcher.lexicon.prefix_terms(p)
        if not terms:
            continue
        cf = searcher.lexicon.cf(terms)
        ranked = sorted(terms, key=lambda t: (-cf.get(t, 0), t))[:AUTOCOMPLETE_K]
        for i, t in enumerate(ranked, 1):
            rows_p.append(p)
            rows_r.append(i)
            rows_t.append(t)
            rows_c.append(cf.get(t, 0))
    return pa.table(
        {
            "prefix": pa.array(rows_p, pa.string()),
            "rank": pa.array(rows_r, pa.int64()),
            "term": pa.array(rows_t, pa.string()),
            "cf": pa.array(rows_c, pa.int64()),
        }
    )


def autocomplete_sql_oracle() -> str:
    selects = []
    for p in AUTOCOMPLETE_PREFIXES:
        selects.append(
            f"""
SELECT '{p}' AS prefix, rank, term, cf FROM (
  SELECT term, CAST(count(*) AS BIGINT) AS cf,
         CAST(row_number() OVER (ORDER BY count(*) DESC, term ASC) AS BIGINT) AS rank
  FROM t WHERE term LIKE '{p}%' GROUP BY term
) WHERE rank <= {AUTOCOMPLETE_K}"""
        )
    return _corpus_ctes() + "\n" + " UNION ALL ".join(selects)


def ranker_agreement(sf_dir: str) -> pa.Table:
    """IR evaluation: per query, how much the two ranking models over the
    same index agree — overlap@10 (shared docs in the top-10s) and the
    Spearman footrule on the intersection (sum |rank_bm25 - rank_lm|,
    exact ints).  Both rankers run their normal distributed paths; the
    metric is O(k) driver arithmetic on the two tiny rank tables.
    Output (qid, overlap, footrule) for every qid either ranker answered.
    The SQL oracle recomputes BOTH rankers from scratch and the same
    metric — a composition check over two independently-green contracts."""
    bm = bm25_topk(sf_dir).to_pandas()
    lm = lm_dirichlet_topk(sf_dir).to_pandas()[["qid", "rank", "doc_id"]]
    j = bm.merge(lm, on=["qid", "doc_id"], suffixes=("_b", "_l"))
    j["fr"] = (j["rank_b"] - j["rank_l"]).abs()
    agg = (
        j.groupby("qid")
        .agg(overlap=("doc_id", "count"), footrule=("fr", "sum"))
        .reset_index()
    )
    qids = sorted(set(bm["qid"]) | set(lm["qid"]))
    import pandas as pd

    out = (
        pd.DataFrame({"qid": qids})
        .merge(agg, on="qid", how="left")
        .fillna(0)
    )
    return pa.table(
        {
            "qid": pa.array(out["qid"].astype("int64"), pa.int64()),
            "overlap": pa.array(out["overlap"].astype("int64"), pa.int64()),
            "footrule": pa.array(out["footrule"].astype("int64"), pa.int64()),
        }
    )


def ranker_agreement_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    mu = LM_MU
    return _corpus_ctes() + f""",
q(qid, term) AS (VALUES {values}),
bscored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q JOIN tf USING (term) JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
btop AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
    FROM bscored
  ) WHERE rank <= 10
),
cf AS (SELECT term, count(*) AS cf FROM t GROUP BY term),
c AS (SELECT count(*) * 1.0 AS c FROM t),
lscored AS (
  SELECT q.qid, tf.doc_id,
         sum(ln(1.0 + tf.tf / (({mu} * cf.cf) / c.c)))
         + count(*) * ln({mu} / (dl.dl + {mu})) AS score
  FROM q JOIN tf USING (term) JOIN cf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN c
  GROUP BY q.qid, tf.doc_id, dl.dl
),
ltop AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
    FROM lscored
  ) WHERE rank <= 10
),
qq AS (SELECT DISTINCT qid FROM btop UNION SELECT DISTINCT qid FROM ltop),
j AS (
  SELECT b.qid, count(*) AS overlap, sum(abs(b.rank - l.rank)) AS footrule
  FROM btop b JOIN ltop l USING (qid, doc_id) GROUP BY b.qid
)
SELECT qq.qid,
       CAST(COALESCE(j.overlap, 0) AS BIGINT) AS overlap,
       CAST(COALESCE(j.footrule, 0) AS BIGINT) AS footrule
FROM qq LEFT JOIN j USING (qid)"""


# percolator registry: (pq_id, terms, mode) — mode 'all' requires every
# term in the document, 'any' at least one (Elasticsearch percolate:
# store the queries, stream the documents)
PERC_QUERIES: list[tuple[int, list[str], str]] = [
    (1, ["fast", "merge"], "all"),
    (2, ["spark"], "any"),
    (3, ["scan", "window", "table"], "all"),
    (4, ["stream", "customer"], "any"),
    (5, ["xyzzy"], "any"),  # never matches: empty-result path
]


class _Percolator:
    """Stateful percolation stage: the stored-query registry compiles to a
    term -> query-ids inverted map ONCE per worker (``stage_fn`` init);
    each documents batch evaluates every stored query vectorized —
    distinct-matched-term counts per (doc, query) via one isin + one
    bincount per query."""

    def __init__(self):
        from ..functions.tokenize import TokenNormalizer

        self.norm = TokenNormalizer("simple")
        self.queries = [
            (pq_id, sorted(set(terms)), 1 if mode == "any" else len(set(terms)))
            for pq_id, terms, mode in PERC_QUERIES
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import doc_term_tf

        d, tid, _tf, vocab = doc_term_tf(batch["text"], self.norm)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "pq_id": pa.array([], pa.int64())}
        )
        if not vocab:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = {t: i for i, t in enumerate(vocab)}
        out_d, out_q = [], []
        n = len(batch)
        for pq_id, terms, need in self.queries:
            tidx = np.array([pos[t] for t in terms if t in pos], dtype=np.int64)
            if len(tidx) == 0 or (need > 1 and len(tidx) < need):
                continue  # a required term absent from this batch's vocab
            sel = np.isin(tid, tidx)
            # (doc, term) rows are distinct, so this counts distinct terms
            cnt = np.bincount(d[sel], minlength=n)
            hit = np.flatnonzero(cnt >= need)
            if len(hit):
                out_d.append(ids[hit])
                out_q.append(np.full(len(hit), pq_id, np.int64))
        if not out_d:
            return empty
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "pq_id": pa.array(np.concatenate(out_q), pa.int64()),
            }
        )


def percolate_queries(sf_dir: str) -> ray.data.Dataset:
    """Reverse search (Elasticsearch percolate): match every document in
    the corpus against the stored-query registry ``PERC_QUERIES`` —
    the alerting / route-on-ingest primitive.  One streaming pass; the
    registry compiles once per worker; output (doc_id, pq_id) matches.
    At 100 TB this is exactly the ingest-tap shape: the stage bolts onto
    the build pipeline's tokenize pass at zero extra scans."""
    from ..util import stage_fn
    from .text import docs_dataset

    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        stage_fn(_Percolator), batch_format="pyarrow", batch_size=512
    )


def percolate_sql_oracle() -> str:
    values = ", ".join(
        f"({pq_id}, '{t}')"
        for pq_id, terms, _ in PERC_QUERIES
        for t in sorted(set(terms))
    )
    needs = ", ".join(
        f"({pq_id}, {1 if mode == 'any' else len(set(terms))})"
        for pq_id, terms, mode in PERC_QUERIES
    )
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''),
        pq(pq_id, term) AS (VALUES {values}),
        need(pq_id, n) AS (VALUES {needs}),
        m AS (
          SELECT pq.pq_id, t.doc_id, count(DISTINCT t.term) AS c
          FROM pq JOIN t USING (term) GROUP BY 1, 2
        )
        SELECT m.doc_id, m.pq_id
        FROM m JOIN need USING (pq_id) WHERE m.c >= need.n
    """


SIG_TOP = 10


def significant_terms(sf_dir: str) -> pa.Table:
    """Significant-terms aggregation (Elasticsearch ``significant_terms``):
    per flagship query, the terms most overrepresented in the MATCHING
    documents vs the corpus background — lift = (df_fg/n_fg)/(df_bg/N),
    ranked per query by ``df_fg/df_bg`` (the per-query constants drop
    out of the ordering), term-ASC tie-break, the query's own terms
    excluded.  Output (qid, rank, term, df_fg, df_bg), top ``SIG_TOP``.

    Distributed shape: the match set comes from the shard actors (the
    index as a filter, ``match_docs``), is broadcast once via
    ``ray.put``, and one streaming pass over ``documents`` emits
    pre-aggregated per-batch (qid, term, df) partials -> one small
    groupby; df_bg joins from the merged lexicon (same tokenization as
    the corpus CTE).  At a match set too large to broadcast, the id
    filter swaps for the bucketed ``hash_join`` (``join.py``) — the
    pass's shape is otherwise unchanged."""
    from ..functions.tokenize import TokenNormalizer, doc_term_tf
    from ..util import stage_fn
    from .text import docs_dataset

    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    match_sets: dict[int, np.ndarray] = {}
    for qid, terms, _ in DOC_QUERIES:
        m = searcher.match_docs(" ".join(terms))
        if len(m):
            match_sets[qid] = np.sort(m)
    qterms = {qid: set(terms) for qid, terms, _ in DOC_QUERIES}
    ms_ref = ray.put(match_sets)

    class _FgPartials:
        """batch -> (qid, term, df_part): distinct matching docs per term,
        pre-aggregated inside the batch (the combiner)."""

        def __init__(self):
            self.ms = ray.get(ms_ref)
            self.norm = TokenNormalizer("simple")

        def __call__(self, batch: pa.Table) -> pa.Table:
            d, tid, _tf, vocab = doc_term_tf(batch["text"], self.norm)
            empty = pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "df_part": pa.array([], pa.int64()),
                }
            )
            if not vocab:
                return empty
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            doc_of = ids[d]  # (doc, term) rows are distinct per doc
            vocab_arr = np.asarray(vocab, dtype=object)
            qs, ts, cs = [], [], []
            for qid, mset in self.ms.items():
                mask = np.isin(doc_of, mset)
                if not mask.any():
                    continue
                bc = np.bincount(tid[mask], minlength=len(vocab))
                nz = np.flatnonzero(bc)
                qs.append(np.full(len(nz), qid, np.int64))
                ts.append(vocab_arr[nz])
                cs.append(bc[nz].astype(np.int64))
            if not qs:
                return empty
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(qs), pa.int64()),
                    "term": pa.array(
                        np.concatenate(ts).tolist(), pa.string()
                    ),
                    "df_part": pa.array(np.concatenate(cs), pa.int64()),
                }
            )

    from ray.data.aggregate import Sum

    fg = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_FgPartials), batch_format="pyarrow", batch_size=512
        )
        .groupby(["qid", "term"])
        .aggregate(Sum("df_part", alias_name="df_fg"))
        .to_pandas()
    )
    if len(fg) == 0:
        return pa.schema(
            [
                ("qid", pa.int64()),
                ("rank", pa.int64()),
                ("term", pa.string()),
                ("df_fg", pa.int64()),
                ("df_bg", pa.int64()),
            ]
        ).empty_table()
    fg = fg[
        ~fg.apply(lambda r: r["term"] in qterms.get(r["qid"], ()), axis=1)
    ].copy()
    bg = searcher.lexicon.idf(sorted(fg["term"].unique().tolist()))
    fg["df_bg"] = fg["term"].map(lambda t: bg[t][0]).astype("int64")
    # same IEEE double division as the oracle's CAST(df_fg AS DOUBLE)/df_bg
    fg["lift"] = fg["df_fg"].to_numpy(np.float64) / fg["df_bg"].to_numpy(
        np.float64
    )
    fg = fg.sort_values(
        ["qid", "lift", "term"], ascending=[True, False, True], kind="stable"
    )
    fg["rank"] = fg.groupby("qid").cumcount() + 1
    fg = fg[fg["rank"] <= SIG_TOP]
    return pa.Table.from_pandas(
        fg[["qid", "rank", "term", "df_fg", "df_bg"]], preserve_index=False
    ).cast(
        pa.schema(
            [
                ("qid", pa.int64()),
                ("rank", pa.int64()),
                ("term", pa.string()),
                ("df_fg", pa.int64()),
                ("df_bg", pa.int64()),
            ]
        )
    )


def significant_terms_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return _corpus_ctes() + f""",
q(qid, term) AS (VALUES {values}),
dt AS (SELECT DISTINCT doc_id, term FROM t),
m AS (SELECT DISTINCT q.qid, dt.doc_id FROM q JOIN dt USING (term)),
fg AS (
  SELECT m.qid, dt.term, count(*) AS df_fg
  FROM m JOIN dt USING (doc_id)
  GROUP BY m.qid, dt.term
),
fgx AS (
  SELECT fg.* FROM fg
  LEFT JOIN q ON q.qid = fg.qid AND q.term = fg.term
  WHERE q.term IS NULL
),
r AS (
  SELECT fgx.qid, fgx.term, fgx.df_fg, df.df AS df_bg,
         CAST(row_number() OVER (
           PARTITION BY fgx.qid
           ORDER BY CAST(fgx.df_fg AS DOUBLE) / df.df DESC, fgx.term ASC
         ) AS BIGINT) AS rank
  FROM fgx JOIN df USING (term)
)
SELECT qid, rank, term, CAST(df_fg AS BIGINT) AS df_fg, CAST(df_bg AS BIGINT) AS df_bg
FROM r WHERE rank <= {SIG_TOP}"""


MMR_CAND = 20  # BM25 candidate pool per query
MMR_K = 10
# lambda = 0.7 in exact integer form: decide on 7*rel_e6 - 3*max_sim_e6
MMR_REL_W, MMR_DIV_W = 7, 3


def mmr_rerank(sf_dir: str) -> pa.Table:
    """Maximal-Marginal-Relevance diversified rerank (Carbonell &
    Goldstein 1998) of the flagship BM25 top-``MMR_CAND``: greedily pick
    the candidate maximizing ``0.7*rel - 0.3*max_sim(to picked)``, rel =
    BM25 score, sim = embedding cosine.  Retrieval and the embedding
    fetch are the engine's distributed paths; the greedy loop itself is
    O(qids x CAND^2) driver arithmetic on two tiny matrices — at 100 TB
    only the top-CAND lists ever meet.

    Determinism contract (mirrored by the recursive-CTE SQL oracle):
    decisions compare INTEGER-lifted quantities — rel_e6/sim_e6 =
    floor(x*1e6+0.5), cosine computed in float64 over the float32
    embedding values — with doc_id ASC tie-break, so the greedy argmax
    chain is bit-reproducible (same e6-boundary caveat as
    ``bm25_scores``).  Candidates without an embedding drop from the
    pool (the oracle's JOIN semantics).  Output (qid, rank, doc_id)."""
    from .similarity import _query_matrix

    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    res = searcher.search_many(
        [(" ".join(terms), MMR_CAND) for _, terms, _ in DOC_QUERIES]
    )
    rows_q: list[int] = []
    rows_r: list[int] = []
    rows_d: list[int] = []
    for (qid, _, _), r in zip(DOC_QUERIES, res):
        ids = r["docID"].to_numpy(zero_copy_only=False)
        rel = r["score"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            continue
        emb, found = _query_matrix(sf_dir, ids.tolist())
        found_arr = np.asarray(found, np.int64)
        mask = np.isin(ids, found_arr)
        ids, rel = ids[mask], rel[mask]
        n = len(ids)
        if n == 0:
            continue
        m = emb[np.searchsorted(found_arr, ids)]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        rel_e6 = np.floor(rel * 1e6 + 0.5).astype(np.int64)
        sim_e6 = np.floor((m @ m.T) * 1e6 + 0.5).astype(np.int64)
        remaining = np.ones(n, dtype=bool)
        first = int(np.lexsort((ids, -rel_e6))[0])
        picked = [first]
        remaining[first] = False
        while len(picked) < MMR_K and remaining.any():
            rem = np.flatnonzero(remaining)
            pen = sim_e6[np.ix_(rem, picked)].max(axis=1)
            score = MMR_REL_W * rel_e6[rem] - MMR_DIV_W * pen
            j = int(rem[np.lexsort((ids[rem], -score))[0]])
            picked.append(j)
            remaining[j] = False
        for i, p in enumerate(picked, 1):
            rows_q.append(qid)
            rows_r.append(i)
            rows_d.append(int(ids[p]))
    return pa.table(
        {
            "qid": pa.array(rows_q, pa.int64()),
            "rank": pa.array(rows_r, pa.int64()),
            "doc_id": pa.array(rows_d, pa.int64()),
        }
    )


def mmr_rerank_sql_oracle() -> str:
    """Greedy MMR as a DuckDB RECURSIVE CTE: the working table carries the
    picked list; each step LATERAL-joins the max sim_e6 against it and
    window-ranks the integer MMR score (7*rel_e6 - 3*max_sim_e6, doc_id
    ASC tie-break) — the same lifted-integer decision chain the engine
    runs."""
    # the recursive mmr CTE needs RECURSIVE on the (shared) WITH clause
    ctes = _bm25_ctes().replace("WITH d0 AS", "WITH RECURSIVE d0 AS", 1)
    return ctes + f""",
cand AS (
  SELECT r.qid, r.doc_id,
         CAST(floor(s.score * 1000000 + 0.5) AS BIGINT) AS rel_e6
  FROM ranked r JOIN scored s ON s.qid = r.qid AND s.doc_id = r.doc_id
  WHERE r.rank <= {MMR_CAND}
),
emb AS (
  SELECT c.qid, c.doc_id, c.rel_e6,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
),
sims AS (
  SELECT a.qid, a.doc_id AS x, b.doc_id AS y,
         CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5)
              AS BIGINT) AS sim_e6
  FROM emb a JOIN emb b ON a.qid = b.qid AND a.doc_id <> b.doc_id
),
mmr(qid, step, doc_id, picked) AS (
  (SELECT qid, 1, doc_id, [doc_id]
   FROM (SELECT qid, doc_id,
                row_number() OVER (
                  PARTITION BY qid ORDER BY rel_e6 DESC, doc_id ASC
                ) AS r
         FROM emb) WHERE r = 1)
  UNION ALL
  (SELECT qid, step + 1, doc_id, list_append(picked, doc_id)
   FROM (
     SELECT m.qid, m.step, c.doc_id, m.picked,
            row_number() OVER (
              PARTITION BY m.qid
              ORDER BY ({MMR_REL_W} * c.rel_e6 - {MMR_DIV_W} * mx.s) DESC,
                       c.doc_id ASC
            ) AS r
     FROM mmr m
     JOIN emb c ON c.qid = m.qid AND NOT list_contains(m.picked, c.doc_id)
     JOIN LATERAL (
       SELECT max(s2.sim_e6) AS s
       FROM sims s2
       WHERE s2.qid = m.qid AND s2.x = c.doc_id
         AND list_contains(m.picked, s2.y)
     ) mx ON TRUE
     WHERE m.step < {MMR_K}
   ) WHERE r = 1)
)
SELECT qid, CAST(step AS BIGINT) AS rank, doc_id FROM mmr"""


COLLAPSE_CAP = 2


def bm25_collapse(sf_dir: str) -> pa.Table:
    """Field collapsing (Elasticsearch ``collapse`` / result
    diversification): flagship queries with at most ``COLLAPSE_CAP``
    results per language.  Exact distributed semantics — shards emit
    per-group top-cap candidates, the driver re-caps in global
    (score desc, docID asc) order before the top-k cut
    (``BM25Searcher.search_collapse_many``).  Output
    (qid, rank, doc_id, lang)."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_collapse_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES],
        collapse_col="lang",
        cap=COLLAPSE_CAP,
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables).rename_columns(
        ["qid", "rank", "doc_id", "score", "lang"]
    )
    return t.select(["qid", "rank", "doc_id", "lang"])


def bm25_collapse_sql_oracle() -> str:
    return _bm25_ctes() + f""",
g AS (
  SELECT s.qid, s.doc_id, s.score, d.lang,
         row_number() OVER (
           PARTITION BY s.qid, d.lang ORDER BY s.score DESC, s.doc_id ASC
         ) AS gr
  FROM scored s JOIN d0 d USING (doc_id)
),
cranked AS (
  SELECT qid, doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id ASC
         ) AS BIGINT) AS rank
  FROM g WHERE gr <= {COLLAPSE_CAP}
)
SELECT qid, rank, doc_id, lang FROM cranked WHERE rank <= 10"""


# query-time synonym table (terms from the corpus vocabulary; 'quick' is
# deliberately absent from the corpus — the drop path)
SYNONYMS: dict[str, list[str]] = {
    "merge": ["join"],
    "scan": ["row", "line"],
    "fast": ["quick"],
    "table": ["column"],
}


def bm25_synonyms(sf_dir: str) -> pa.Table:
    """Flagship queries with query-time synonym expansion
    (``BM25Searcher.search_synonyms_many``): each expanded term scores
    with its own idf, disjunction semantics — the standard synonym-filter
    behavior search platforms bolt onto an analyzer chain.  Output
    (qid, rank, doc_id); oracle re-runs BM25 over the pre-expanded term
    lists."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_synonyms_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES], SYNONYMS
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables).rename_columns(["qid", "rank", "doc_id", "score"])
    return t.select(["qid", "rank", "doc_id"])


def bm25_synonyms_sql_oracle() -> str:
    expanded = [
        (
            qid,
            sorted({*terms, *(s for t in terms for s in SYNONYMS.get(t, []))}),
            k,
        )
        for qid, terms, k in DOC_QUERIES
    ]
    return (
        _bm25_ctes(queries=expanded)
        + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"
    )


def bm25_not_sql_oracle() -> str:
    return (
        _bm25_ctes(
            queries=[(qid, terms, k) for qid, terms, _, k in NOT_QUERIES],
            exclude_map={qid: exc for qid, _, exc, _ in NOT_QUERIES},
        )
        + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"
    )


def bm25_and_sql_oracle() -> str:
    return (
        _bm25_ctes(conjunctive=True)
        + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"
    )


MSM_MIN_MATCH = 2


def bm25_msm_topk(sf_dir: str) -> pa.Table:
    """Minimum-should-match BM25 top-k: docs matching >= MSM_MIN_MATCH
    distinct query terms (the standard mid-point between OR recall and AND
    precision).  Same fixture queries as the flagship; q5's two absent
    terms prove the empty edge.  Engine: ``mode='msm'`` counts distinct
    matched terms per doc inside the shard scorer (unpruned decode — a
    skipped sub-block could lose a match COUNT, not just score mass);
    oracle: the shared BM25 CTEs with HAVING count(DISTINCT term) >= m."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES],
        mode="msm",
        msm=MSM_MIN_MATCH,
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_msm_sql_oracle() -> str:
    return (
        _bm25_ctes(min_match=MSM_MIN_MATCH)
        + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"
    )


# (qid, typo'd terms, k) — every typo is one edit from a corpus term;
# q5's token has no neighbor at distance 1, proving the empty edge
FUZZY_QUERIES: list[tuple[int, list[str], int]] = [
    (1, ["fastt", "merge"], 10),
    (2, ["grup", "qury"], 10),
    (3, ["custmer", "strea"], 10),
    (4, ["scann", "tble", "windoww"], 10),
    (5, ["zzzzqx"], 10),
]


def bm25_fuzzy_topk(sf_dir: str) -> pa.Table:
    """Fuzzy BM25 top-k: each query token expands to every vocabulary term
    within Levenshtein distance <= 1, scored as a disjunction with each
    expanded term's own idf.  Engine: SymSpell deletion-neighborhood probe
    over the resident lexicon + exact distance verify
    (``Lexicon.fuzzy_terms``); oracle: the shared BM25 CTEs with the query
    terms joined to the corpus vocabulary through ``levenshtein() <= 1``.
    """
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_fuzzy_many(
        [(" ".join(terms), k) for _, terms, k in FUZZY_QUERIES]
    )
    tables = []
    for (qid, _, _), r in zip(FUZZY_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_fuzzy_sql_oracle() -> str:
    return (
        _bm25_ctes(queries=FUZZY_QUERIES, fuzzy=True)
        + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"
    )


def bm25_meta_sql_oracle() -> str:
    return _bm25_ctes() + (
        "\nSELECT qid, rank, doc_id, lang FROM ranked JOIN documents USING (doc_id)"
        " WHERE rank <= 10"
    )


def phrase_match(sf_dir: str) -> pa.Table:
    """Exact-phrase membership over the positional index: (qid, doc_id).

    Positions restore the reference's positional Post model
    (``/root/reference/index.h:56-60``); oracle = an adjacency regex over
    the normalized text (simple tokenizer space).
    """
    out = documents_index(sf_dir, positions=True)
    searcher = BM25Searcher(out)
    results = searcher.phrase_many([p for _, p in PHRASES])
    tables = []
    for (qid, _), r in zip(PHRASES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "doc_id", "n_matches"]).select(["qid", "doc_id"])


def phrase_sql_oracle() -> str:
    parts = []
    for qid, p in PHRASES:
        toks = p.lower().split()
        pat = "(^|[^a-z0-9])" + "[^a-z0-9]+".join(toks) + "([^a-z0-9]|$)"
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS qid, doc_id FROM documents "
            f"WHERE regexp_matches(lower(text), '{pat}')"
        )
    return " UNION ALL ".join(parts)


def field_term_stats(sf_dir: str) -> pa.Table:
    """Per-field term statistics read back from a field-marker index.

    Builds the documents index with ``field_col="lang"`` (terms also
    indexed under ``{lang}:{term}`` marker keys — the reference's prefixed
    dictionary namespaces, ``/root/reference/index.h:320-326``) and returns
    the prefixed slice of its merged lexicon: (field_term, cf, df).
    """
    out = _index_dir_for(sf_dir) + "_field"
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=16,
        batch_size=512,
        salt_docs=4096,
        field_col="lang",
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    lex = pa.concat_tables(
        pq.read_table(f)
        for f in sorted(glob.glob(os.path.join(out, "lexicon", "*.parquet")))
    )
    import pyarrow.compute as pc

    mask = pc.match_substring(lex["term"], ":")
    t = lex.filter(mask)
    return t.rename_columns(["field_term", "df", "cf"]).select(
        ["field_term", "cf", "df"]
    )


def field_term_stats_sql_oracle() -> str:
    return """
        WITH tok AS (
          SELECT doc_id, lang,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, lang, term FROM tok WHERE term <> '')
        SELECT lang || ':' || term AS field_term, count(*) AS cf,
               count(DISTINCT doc_id) AS df
        FROM t GROUP BY 1
    """


def bm25_head_boost(sf_dir: str) -> pa.Table:
    """BM25 with a 2.0x boost on matches inside the first 8 tokens of each
    document ("head" namespace) — the reference's style/weight bits
    (``/root/reference/index.h:44-49``: title/head postings carry a style
    marker the ranker can weight) realized as marker-namespace postings
    plus a rank-time weight.  Returns (qid, rank, doc_id); the oracle
    recomputes content + 2.0 x head scores in SQL."""
    searcher = BM25Searcher(documents_head_index(sf_dir))
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES], boost={"head": 2.0}
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_head_boost_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT doc_id, unnest(toks) AS term FROM arr),
th AS (SELECT doc_id, unnest(toks[1:8]) AS term FROM arr),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
tfh AS (SELECT doc_id, term, count(*) AS tf FROM th GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
dfh AS (SELECT term, count(DISTINCT doc_id) AS df FROM th GROUP BY term),
q(qid, term) AS (VALUES {values}),
scored_c AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
scored_h AS (
  SELECT q.qid, tfh.doc_id,
         sum(
           ln((stats.n - dfh.df + 0.5) / (dfh.df + 0.5) + 1.0)
           * (tfh.tf * 2.2)
           / (tfh.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tfh USING (term)
  JOIN dfh USING (term)
  JOIN dl ON tfh.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tfh.doc_id
),
scored AS (
  SELECT c.qid, c.doc_id, c.score + 2.0 * coalesce(h.score, 0.0) AS score
  FROM scored_c c LEFT JOIN scored_h h ON c.qid = h.qid AND c.doc_id = h.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""


def bm25_style_boost(sf_dir: str) -> pa.Table:
    """BM25 over a style-bit index: each posting carries a 1-bit style flag
    (term first occurs within the first 8 tokens of the document) folded
    into the wire tf slot — the reference's per-posting style/weight bits
    (``/root/reference/index.h:44-49``, payload layout ``index.h:56-60``).
    Styled postings score with ``tf * 2.0`` at rank time.  Returns
    (qid, rank, doc_id); the oracle recomputes BM25 in SQL with the same
    tf inflation on head-styled (doc, term) pairs."""
    out = _index_dir_for(sf_dir) + "_style"
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=16,
        batch_size=512,
        salt_docs=4096,
        style_head=8,
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES], style_weight=2.0
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_style_boost_sql_oracle() -> str:
    """BM25 with tf' = tf * 2 for (doc, term) pairs whose first occurrence
    ordinal is < 8 — the SQL mirror of the style-bit semantics (style =
    "first occurrence in the head window", weight applied inside the tf
    saturation, df/dl/avgdl untouched)."""
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT doc_id, unnest(toks) AS term FROM arr),
th AS (SELECT DISTINCT doc_id, unnest(toks[1:8]) AS term FROM arr),
tf0 AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
tf AS (
  SELECT tf0.doc_id, tf0.term,
         tf0.tf * CASE WHEN th.term IS NOT NULL THEN 2.0 ELSE 1.0 END AS tf
  FROM tf0 LEFT JOIN th ON th.doc_id = tf0.doc_id AND th.term = tf0.term
),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
q(qid, term) AS (VALUES {values}),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""


def bm25_field_scoped(sf_dir: str) -> pa.Table:
    """BM25 scoped to one field namespace: query terms are looked up under
    their ``en:{term}`` marker keys (the reference's prefixed dictionary,
    ``/root/reference/index.h:320-326``), so only documents whose ``lang``
    is ``en`` can match; idf comes from the marker (within-field) df while
    doc lengths and avgdl stay corpus-global.  Returns (qid, rank, doc_id)."""
    out = _index_dir_for(sf_dir) + "_field"
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=16,
        batch_size=512,
        salt_docs=4096,
        field_col="lang",
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES], field="en"
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_field_scoped_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
ten AS (
  SELECT t.doc_id, t.term FROM t JOIN documents d USING (doc_id)
  WHERE d.lang = 'en'
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM ten GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM ten GROUP BY term),
q(qid, term) AS (VALUES {values}),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""


def doc_lookup(sf_dir: str) -> pa.Table:
    """Key -> document-entry lookup over the index docmap (the reference's
    ``FindUrl``, ``/root/reference/index.h:409``): resolve the ``source``
    values of doc_ids 0-2, then probe the docmap for EVERY doc sharing one
    of those sources.  Returns (doc_id, source, lang, n_tokens) where
    n_tokens comes from the index's own tokenization — so the row also
    cross-checks the docmap sidecar against plain SQL."""
    import pyarrow.dataset as pads

    from .query import find_docs

    out = documents_index(sf_dir)
    keys = (
        pads.dataset(f"{sf_dir}/documents.parquet")
        .to_table(columns=["source"], filter=pads.field("doc_id").isin([0, 1, 2]))
    )["source"].to_pylist()
    t = find_docs(out, "source", sorted(set(keys)))
    t = t.select(["doc_id", "source", "lang", "n_tokens"])
    return t.sort_by([("doc_id", "ascending")])


def doc_lookup_sql_oracle() -> str:
    return """
        WITH keys AS (SELECT DISTINCT source FROM documents WHERE doc_id IN (0, 1, 2)),
        tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        d AS (SELECT doc_id, count(*) AS n_tokens FROM t GROUP BY doc_id)
        SELECT doc_id, source, lang,
               CAST(coalesce(d.n_tokens, 0) AS BIGINT) AS n_tokens
        FROM documents JOIN keys USING (source)
        LEFT JOIN d USING (doc_id)
    """


def index_terms(sf_dir: str) -> pa.Table:
    """Round-trip: decode all posting blocks -> (term, df, cf).

    Reads the shard parquet the build wrote, unpacks every varint block,
    and recomputes the aggregates from raw postings — checked against the
    plain SQL term stats.
    """
    out = documents_index(sf_dir)
    files = sorted(glob.glob(os.path.join(out, "chunks", "*", "parts", "*.parquet")))

    def decode_file(batch: pa.Table) -> pa.Table:
        """One vectorized varint decode per shard file — the whole file's
        posting blobs are contiguous in the Arrow binary buffer, so the
        stream decodes in a single pass (no per-row Python loop)."""
        from ..stages.pack import SKIP_INTERVAL

        tables = []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=["term", "df", "postings"])
            df = t["df"].to_numpy(zero_copy_only=False)
            total = int(df.sum())
            if total == 0:
                continue
            col = t["postings"].combine_chunks()
            offs = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1)
            data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
            gaps, tfs = varint.unpack_postings(data[offs[0] : offs[-1]], total)
            starts = np.zeros(len(df), dtype=np.int64)
            np.cumsum(df[:-1], out=starts[1:])
            pos_in_block = np.arange(total) - np.repeat(starts, df)
            ridx = np.flatnonzero(pos_in_block % SKIP_INTERVAL == 0)
            g = gaps.astype(np.int64)
            c = np.cumsum(g)
            corrections = c[ridx] - g[ridx]
            docs = c - np.repeat(corrections, np.diff(np.append(ridx, total)))
            blk = np.repeat(np.arange(len(df)), df)
            same = blk[1:] == blk[:-1]
            assert (docs[1:][same] > docs[:-1][same]).all(), "postings not strictly increasing"
            cfs = np.add.reduceat(tfs.astype(np.int64), starts)
            tables.append(
                pa.table(
                    {
                        "term": t["term"],
                        "df_part": pa.array(df.astype(np.int64)),
                        "cf_part": pa.array(cfs),
                    }
                )
            )
        if not tables:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df_part": pa.array([], pa.int64()),
                    "cf_part": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(tables)

    ds = (
        ray.data.from_items([{"path": f} for f in files])
        .map_batches(decode_file, batch_format="pyarrow", batch_size=1)
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"), Sum("cf_part", alias_name="cf"))
    )
    return ds.to_pandas().pipe(pa.Table.from_pandas, preserve_index=False).select(
        ["term", "df", "cf"]
    )


def term_prefix_stats(sf_dir: str, prefix: str = "s") -> pa.Table:
    """Dictionary prefix query: one sorted-lexicon range scan.

    The reference keeps its dictionary sorted for exactly this ordered
    iteration (``/root/reference/index.h:320-326``); here the merged
    lexicon parquet is term-sorted and term-unique, so a prefix query is a
    row-group-pruned range read over ``[prefix, prefix+1)`` — no posting
    decode, no shuffle, O(matching vocabulary) I/O at any corpus size.
    """
    import pyarrow.dataset as pads

    out = documents_index(sf_dir)
    hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    t = pads.dataset(
        sorted(glob.glob(os.path.join(out, "lexicon", "*.parquet")))
    ).to_table(
        columns=["term", "df", "cf"],
        filter=(pads.field("term") >= prefix) & (pads.field("term") < hi),
    )
    return t.sort_by([("term", "ascending")])


def term_prefix_stats_sql_oracle(prefix: str = "s") -> str:
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> '')
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
        FROM t WHERE term LIKE '{prefix}%' GROUP BY term
    """


NEAR_QUERIES: list[tuple[int, str, str, int]] = [
    (1, "slow", "fast", 1),
    (2, "key", "value", 3),
    (3, "table", "part", 2),
    (4, "xyzzy", "warp", 5),  # absent term: empty result path
]


def near_match(sf_dir: str) -> pa.Table:
    """Proximity query over the positional index: (qid, doc_id, n_matches).

    Docs where the two terms occur within ``w`` token positions of each
    other; completes the positional Post model's query surface next to
    ``phrase_match`` (reference position space:
    ``/root/reference/index.h:56-60``).
    """
    out = documents_index(sf_dir, positions=True)
    searcher = BM25Searcher(out)
    results = searcher.near_many([(a, b, w) for _, a, b, w in NEAR_QUERIES])
    tables = []
    for (qid, *_), r in zip(NEAR_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "doc_id", "n_matches"])


def near_match_sql_oracle() -> str:
    values = ", ".join(f"({qid}, '{a}', '{b}', {w})" for qid, a, b, w in NEAR_QUERIES)
    return f"""
        WITH arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        p AS (
          SELECT doc_id, unnest(toks) AS term,
                 unnest(range(1, len(toks) + 1)) AS pos
          FROM arr
        ),
        q(qid, ta, tb, w) AS (VALUES {values}),
        hits AS (
          SELECT DISTINCT q.qid, a.doc_id, a.pos
          FROM q
          JOIN p a ON a.term = q.ta
          JOIN p b ON b.doc_id = a.doc_id AND b.term = q.tb
                   AND abs(a.pos - b.pos) <= q.w
        )
        SELECT qid, doc_id, CAST(count(*) AS BIGINT) AS n_matches
        FROM hits GROUP BY qid, doc_id
    """


def search_snippets(sf_dir: str, w: int = 3) -> pa.Table:
    """BM25 results with a keyword-in-context snippet:
    (qid, rank, doc_id, snippet).

    The snippet is the +-w-token window (normalized token space, so the
    SQL oracle can mirror it exactly) around the FIRST occurrence of any
    query term.  Document text is fetched with ONE predicate-pushdown read
    for all result docs — the result set is the small side; the corpus is
    never rescanned.
    """
    import pyarrow.dataset as pads

    from ..functions.tokenize import TokenNormalizer, tokenize_batch

    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
    )
    all_ids = sorted({i for r in results for i in r["docID"].to_pylist()})
    tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(all_ids)
    )
    d, tid, vocab = tokenize_batch(tbl["text"].combine_chunks(), TokenNormalizer("simple"))
    toks_of: dict[int, list[str]] = {i: [] for i in tbl["doc_id"].to_pylist()}
    ids = tbl["doc_id"].to_pylist()
    for row, t in zip(d, tid):
        toks_of[ids[row]].append(vocab[t])
    rows = {"qid": [], "rank": [], "doc_id": [], "snippet": []}
    for (qid, terms, _), r in zip(DOC_QUERIES, results):
        tset = set(terms)
        for rank, did in zip(r["rank"].to_pylist(), r["docID"].to_pylist()):
            toks = toks_of[did]
            p = next((i for i, t in enumerate(toks) if t in tset), None)
            if p is None:
                continue  # unreachable for OR-mode results; defensive
            rows["qid"].append(qid)
            rows["rank"].append(rank)
            rows["doc_id"].append(did)
            rows["snippet"].append(" ".join(toks[max(0, p - w) : p + w + 1]))
    return pa.table(
        {
            "qid": pa.array(rows["qid"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "snippet": pa.array(rows["snippet"], pa.string()),
        }
    )


def search_snippets_sql_oracle(w: int = 3) -> str:
    return _bm25_ctes() + f""",
        arr AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        firstpos AS (
          SELECT r.qid, r.rank, r.doc_id,
                 min(list_position(a.toks, q.term)) AS p
          FROM ranked r
          JOIN q ON q.qid = r.qid
          JOIN arr a ON a.doc_id = r.doc_id
          WHERE r.rank <= 10 AND list_position(a.toks, q.term) IS NOT NULL
          GROUP BY 1, 2, 3
        )
        SELECT f.qid, f.rank, f.doc_id,
               array_to_string(
                 list_slice(a.toks, greatest(1, f.p - {w}),
                            least(len(a.toks), f.p + {w})), ' ') AS snippet
        FROM firstpos f JOIN arr a USING (doc_id)
    """


# did-you-mean fixtures: misspellings of corpus vocabulary terms ("spart"
# is deliberately ambiguous — lev<=1 of both "spark" and "part"; "zzz"
# matches nothing, pinning the empty path)
SPELL_QUERIES: list[str] = [
    "custoner", "ky", "qery", "sor", "spart", "windoww", "zzz",
]
SPELL_TOPN = 3


def spell_suggest(sf_dir: str) -> pa.Table:
    """Did-you-mean suggestions: for each query term, every lexicon term
    within Levenshtein distance <= 1, ranked by collection frequency
    (cf DESC, term ASC), top ``SPELL_TOPN``.

    Candidate generation is the SymSpell deletion-neighborhood probe over
    the driver-resident lexicon (``Lexicon.fuzzy_terms`` — the same
    expansion the fuzzy BM25 mode uses); popularity comes from ONE
    term-filtered read of the merged lexicon parquet (cf = A1 of the
    reference's exported statistics, ``/root/reference/index.h``).  No
    corpus pass: work is O(|query| x deletion-neighborhood).
    """
    import pyarrow.dataset as pads

    from .build import load_stats
    from .query import Lexicon

    out = documents_index(sf_dir)
    lex = Lexicon(out, load_stats(out)["N"])
    cands = {q: lex.fuzzy_terms(q) for q in SPELL_QUERIES}
    all_terms = sorted({t for ts in cands.values() for t in ts})
    lex_files = sorted(glob.glob(os.path.join(out, "lexicon", "*.parquet")))
    cf_tbl = pads.dataset(lex_files).to_table(
        columns=["term", "cf"], filter=pads.field("term").isin(all_terms)
    )
    cf = dict(zip(cf_tbl["term"].to_pylist(), cf_tbl["cf"].to_pylist()))
    rows = {"qterm": [], "rank": [], "suggestion": [], "cf": []}
    for q in SPELL_QUERIES:
        ranked = sorted(cands[q], key=lambda t: (-cf[t], t))[:SPELL_TOPN]
        for i, t in enumerate(ranked, 1):
            rows["qterm"].append(q)
            rows["rank"].append(i)
            rows["suggestion"].append(t)
            rows["cf"].append(cf[t])
    return pa.table(
        {
            "qterm": pa.array(rows["qterm"], pa.string()),
            "rank": pa.array(rows["rank"], pa.int64()),
            "suggestion": pa.array(rows["suggestion"], pa.string()),
            "cf": pa.array(rows["cf"], pa.int64()),
        }
    )


def spell_suggest_sql_oracle() -> str:
    values = ", ".join(f"('{q}')" for q in SPELL_QUERIES)
    return f"""
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT term FROM tok WHERE term <> ''),
        voc AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM t GROUP BY term),
        q(qterm) AS (VALUES {values}),
        cand AS (
          SELECT q.qterm, voc.term AS suggestion, voc.cf
          FROM q JOIN voc ON levenshtein(q.qterm, voc.term) <= 1
        ),
        ranked AS (
          SELECT qterm, suggestion, cf,
                 CAST(row_number() OVER (
                   PARTITION BY qterm ORDER BY cf DESC, suggestion ASC
                 ) AS BIGINT) AS rank
          FROM cand
        )
        SELECT qterm, rank, suggestion, cf FROM ranked
        WHERE rank <= {SPELL_TOPN}
    """


# hybrid retrieval fixtures: (qid, text query, query vec_id) — text and
# dense retrievers run over the SAME corpus ids (documents.doc_id ==
# embeddings.vec_id in the testdata contract)
HYBRID_QUERIES: list[tuple[int, str, int]] = [
    (1, "fast key merge sort", 0),
    (2, "group query spark", 1),
    (3, "customer filter stream", 2),
]
HYBRID_K_SIDE = 20  # per-retriever candidate depth
HYBRID_K = 10
HYBRID_RRF_C = 60  # the standard RRF constant (Cormack et al., SIGIR'09)


def hybrid_search(sf_dir: str) -> pa.Table:
    """Hybrid retrieval: BM25 (sparse) and exact cosine kNN (dense)
    candidates fused with reciprocal-rank fusion —
    ``rrf(d) = Σ_retrievers 1/(C + rank_r(d))`` over the union of both
    top-``HYBRID_K_SIDE`` lists, C = 60, ties broken by doc_id ASC.

    Both retrievers are the engine's own distributed paths (shard-actor
    BM25; broadcast-query matmul kNN); fusion itself is O(qids x K) driver
    arithmetic on ranks — at 100 TB only the two top-K lists meet, never
    the corpora.  RRF on integer ranks keeps the score a two-term IEEE sum
    (1/(C+rt) + 1/(C+rd)), bit-reproducible against the SQL oracle.
    """
    from .similarity import knn_cosine

    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    text_res = searcher.search_many(
        [(q, HYBRID_K_SIDE) for _, q, _ in HYBRID_QUERIES]
    )
    dense = knn_cosine(
        sf_dir,
        query_ids=tuple(v for _, _, v in HYBRID_QUERIES),
        k=HYBRID_K_SIDE,
    )
    d_qid = dense["qid"].to_numpy(zero_copy_only=False)
    d_rank = dense["rank"].to_numpy(zero_copy_only=False)
    d_vid = dense["vec_id"].to_numpy(zero_copy_only=False)
    rows = {"qid": [], "rank": [], "doc_id": []}
    for (qid, _q, vid), tr in zip(HYBRID_QUERIES, text_res):
        rrf: dict[int, float] = {}
        for i, d in enumerate(tr["docID"].to_pylist(), 1):
            rrf[d] = 1.0 / (HYBRID_RRF_C + i)
        sel = np.flatnonzero(d_qid == vid)
        for r, d in zip(d_rank[sel], d_vid[sel]):
            d = int(d)
            # text term first, dense second — the same two-term addition
            # order as the oracle's coalesce(t)+coalesce(d)
            rrf[d] = rrf.get(d, 0.0) + 1.0 / (HYBRID_RRF_C + int(r))
        ranked = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:HYBRID_K]
        for i, (d, _s) in enumerate(ranked, 1):
            rows["qid"].append(qid)
            rows["rank"].append(i)
            rows["doc_id"].append(d)
    return pa.table(
        {
            "qid": pa.array(rows["qid"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
        }
    )


def hybrid_search_sql_oracle() -> str:
    tq = [(qid, q.split(), HYBRID_K_SIDE) for qid, q, _ in HYBRID_QUERIES]
    qv_values = ", ".join(f"({qid}, {vid})" for qid, _, vid in HYBRID_QUERIES)
    c = HYBRID_RRF_C
    return _bm25_ctes(queries=tq) + f""",
tranked AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= {HYBRID_K_SIDE}),
qv(qid, vid) AS (VALUES {qv_values}),
dsc AS (
  SELECT qv.qid, e.vec_id AS doc_id,
         list_cosine_similarity(qe.embedding, e.embedding) AS sim
  FROM qv
  JOIN embeddings qe ON qe.vec_id = qv.vid
  CROSS JOIN embeddings e
),
dranked AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, doc_id ASC) AS BIGINT) AS rank
    FROM dsc
  ) WHERE rank <= {HYBRID_K_SIDE}
),
u AS (
  SELECT qid, doc_id FROM tranked
  UNION
  SELECT qid, doc_id FROM dranked
),
fused AS (
  SELECT u.qid, u.doc_id,
         coalesce(CAST(1.0 AS DOUBLE) / ({c} + t.rank), 0)
         + coalesce(CAST(1.0 AS DOUBLE) / ({c} + d.rank), 0) AS rrf
  FROM u
  LEFT JOIN tranked t ON t.qid = u.qid AND t.doc_id = u.doc_id
  LEFT JOIN dranked d ON d.qid = u.qid AND d.doc_id = u.doc_id
)
SELECT qid, rank, doc_id FROM (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
  FROM fused
) WHERE rank <= {HYBRID_K}"""


def federated_bm25(sf_dir: str) -> pa.Table:
    """BM25 over TWO partition indexes — documents split by ``lang ==
    'en'`` vs the rest, each built into its own index — searched through
    ``FederatedBM25`` with exactly-merged global statistics.

    The oracle is deliberately the SINGLE-corpus BM25 SQL
    (``bm25_sql_oracle``): partition transparency means federation must
    be invisible in the output, ranks and scores alike.  Fixture prep
    (the lang filter + two small builds) is driver-side at test scale;
    at 100 TB the split IS the layout — each node group owns a partition
    and only (#partitions × #terms) integers merge centrally.
    """
    import pyarrow.dataset as pads

    from .query import FederatedBM25

    base = _index_dir_for(sf_dir)
    dirs = []
    for name, want_en in [("en", True), ("rest", False)]:
        pdir = f"{base}_fed_{name}"
        src_dir = f"{pdir}_src"
        src = os.path.join(src_dir, "documents.parquet")
        if not os.path.exists(src):
            os.makedirs(src_dir, exist_ok=True)
            dsx = pads.dataset(f"{sf_dir}/documents.parquet")
            expr = (
                pads.field("lang") == "en"
                if want_en
                else pads.field("lang") != "en"
            )
            pq.write_table(dsx.to_table(filter=expr), src)
        cfg = BuildConfig(
            tokenizer="simple",
            text_col="text",
            id_col="doc_id",
            chunk_docs=250_000,
            num_parts=8,
            batch_size=512,
            salt_docs=4096,
        )
        build_index(src, pdir, cfg)
        dirs.append(pdir)
    fed = FederatedBM25(dirs)
    results = fed.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


# index-as-filter fixtures: (qid, query, mode)
FILTER_QUERIES: list[tuple[int, str, str]] = [
    (1, "merge sort", "and"),
    (2, "spark query", "or"),
    (3, "xyzzy", "or"),  # absent term: empty match set
]


def index_filter_docs(sf_dir: str) -> pa.Table:
    """The index as a FILTER: the full (unranked) match set per fixture
    query — (qid, doc_id), every live document matching the query under
    its mode.  This is the index-accelerated selection a downstream
    pipeline starts from (match -> ``find_docs``/predicate-pushdown scan
    -> curation/stats over just the matches), distinct from top-k
    ranking: no scores, no cut.  AND is per-chunk sorted intersection
    inside the shard actors (``SearchShard.match_many``)."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    rows_q, rows_d = [], []
    for qid, q, mode in FILTER_QUERIES:
        docs = searcher.match_docs(q, mode=mode)
        rows_q.append(np.full(len(docs), qid, dtype=np.int64))
        rows_d.append(docs)
    return pa.table(
        {
            "qid": pa.array(np.concatenate(rows_q), pa.int64()),
            "doc_id": pa.array(np.concatenate(rows_d), pa.int64()),
        }
    )


def index_filter_sql_oracle() -> str:
    subqs = []
    for qid, q, mode in FILTER_QUERIES:
        terms = ", ".join(f"'{t}'" for t in sorted(set(q.split())))
        n = len(set(q.split()))
        if mode == "and":
            subqs.append(f"""
        SELECT {qid} AS qid, doc_id FROM t WHERE term IN ({terms})
        GROUP BY doc_id HAVING count(DISTINCT term) = {n}""")
        else:
            subqs.append(f"""
        SELECT {qid} AS qid, doc_id FROM t WHERE term IN ({terms})
        GROUP BY doc_id""")
    union = "\n        UNION ALL".join(subqs)
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT doc_id, term FROM tok WHERE term <> '')
        {union}
        ORDER BY qid, doc_id
    """


def search_after_topk(sf_dir: str, page_size: int = 5, pages: int = 2) -> pa.Table:
    """Cursor-paginated BM25: fetch ``pages`` pages of ``page_size`` per
    fixture query via ``BM25Searcher.search_after``, cursor = the previous
    page's last (score, docID).

    (qid, page, rank, doc_id) — rank is the in-page rank.  Page n+1 must
    continue the global order exactly where page n stopped, so the oracle
    is simply the top page_size*pages split into pages: any cursor drift,
    pruning unsoundness or cross-page float mismatch breaks the hash."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    rows = []
    for qid, terms, _ in DOC_QUERIES:
        q = " ".join(terms)
        cursor = None
        for page in range(1, pages + 1):
            r = searcher.search_after(q, k=page_size, after=cursor)
            if len(r) == 0:
                break
            rows.append(
                pa.table(
                    {
                        "qid": pa.array(np.full(len(r), qid, np.int64)),
                        "page": pa.array(np.full(len(r), page, np.int64)),
                        "rank": r["rank"],
                        "doc_id": r["docID"],
                    }
                )
            )
            if len(r) < page_size:
                break
            cursor = (
                float(r["score"][len(r) - 1].as_py()),
                int(r["docID"][len(r) - 1].as_py()),
            )
    if not rows:
        return pa.schema(
            [("qid", pa.int64()), ("page", pa.int64()),
             ("rank", pa.int64()), ("doc_id", pa.int64())]
        ).empty_table()
    return pa.concat_tables(rows)


def search_after_sql_oracle(page_size: int = 5, pages: int = 2) -> str:
    lim = page_size * pages
    return _bm25_ctes() + f"""
SELECT qid,
       CAST((rank - 1) // {page_size} + 1 AS BIGINT) AS page,
       CAST(rank - ((rank - 1) // {page_size}) * {page_size} AS BIGINT) AS rank,
       doc_id
FROM ranked WHERE rank <= {lim}"""


def merged_bm25(sf_dir: str) -> pa.Table:
    """Physical index merge, end to end: split ``documents`` by doc_id
    parity, build two independent partition indexes, ``merge_indexes`` B
    into A, run the fixture queries over the merged index.

    (qid, rank, doc_id) — the oracle is the plain single-index BM25 SQL:
    the merged index must reproduce the union-corpus ranking exactly
    (global N/avgdl/df re-merged integer-exact; the physical counterpart
    of ``federated_bm25``'s logical merge)."""
    import shutil

    from .compact import merge_indexes

    base = _index_dir_for(sf_dir) + "_merge"
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    even = (t["doc_id"].to_numpy(zero_copy_only=False) % 2) == 0
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=16,
        batch_size=512,
        salt_docs=4096,
    )
    idx = {}
    for name, mask in (("a", even), ("b", ~even)):
        root = f"{base}_{name}"
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(f"{root}_src", ignore_errors=True)  # reruns leave it
        os.makedirs(f"{root}_src")
        pq.write_table(t.filter(pa.array(mask)), f"{root}_src/documents.parquet")
        build_index(f"{root}_src/documents.parquet", root, cfg)
        idx[name] = root
    merge_indexes(idx["a"], idx["b"])
    searcher = BM25Searcher(idx["a"])
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    return (
        pa.concat_tables(tables)
        .rename_columns(["qid", "rank", "doc_id", "score"])
        .select(["qid", "rank", "doc_id"])
    )


PRF_FB_K = 3   # feedback depth: top docs mined for expansion terms
PRF_FB_M = 5   # expansion width: terms added to the query
PRF_K = 10


def prf_search(sf_dir: str) -> pa.Table:
    """Pseudo-relevance feedback (RM3-lite): run each fixture query, mine
    the top PRF_FB_K documents' terms, add the PRF_FB_M best expansion
    terms by ``sum-tf x idf`` (original terms excluded, ties term-ASC) at
    half weight, and rescore.

    (qid, rank, doc_id).  Distribution shape mirrors ``more_like_this``:
    expansion mining is a driver-side probe over PRF_FB_K fetched docs
    (predicate-pushdown parquet read + resident-lexicon idf); both ranking
    passes run through the shard actors — the second via
    ``BM25Searcher.search_weighted`` (1.0 on original terms, 0.5 on
    expansion terms, matching the oracle's UNION ALL weights)."""
    from collections import Counter

    import pyarrow.dataset as pads

    from ..functions.tokenize import split_tokens

    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    page1 = searcher.search_many(
        [(" ".join(terms), PRF_FB_K) for _, terms, _ in DOC_QUERIES]
    )
    fb_ids = sorted({d for r in page1 for d in r["docID"].to_pylist()})
    texts = {}
    if fb_ids:
        tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
            columns=["doc_id", "text"], filter=pads.field("doc_id").isin(fb_ids)
        )
        texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    tables = []
    for (qid, terms, _), r in zip(DOC_QUERIES, page1):
        tf: Counter = Counter()
        for did in r["docID"].to_pylist():
            toks = split_tokens(pa.array([texts[did]]), "simple")[0].as_py()
            tf.update(t for t in toks if t)
        for t in terms:
            tf.pop(t, None)  # expansion excludes the original query terms
        dfidf = searcher.lexicon.idf(sorted(tf))
        ordered = sorted(((-(tf[t] * idf), t) for t, (_df, idf) in dfidf.items()))
        expansion = [t for _, t in ordered[:PRF_FB_M]]
        weighted = [(t, 1.0) for t in terms] + [(t, 0.5) for t in expansion]
        rr = searcher.search_weighted(weighted, k=PRF_K)
        tables.append(
            pa.table(
                {
                    "qid": pa.array(np.full(len(rr), qid, dtype=np.int64)),
                    "rank": rr["rank"],
                    "doc_id": rr["docID"],
                }
            )
        )
    return pa.concat_tables(tables)


def prf_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return _corpus_ctes() + f""",
q0(qid, term) AS (VALUES {values}),
scored0 AS (
  SELECT q0.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q0
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q0.qid, tf.doc_id
),
fb AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rn
    FROM scored0
  ) WHERE rn <= {PRF_FB_K}
),
cand AS (
  SELECT fb.qid, tf.term,
         sum(tf.tf) * ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) AS w
  FROM fb
  JOIN tf USING (doc_id)
  JOIN df USING (term)
  CROSS JOIN stats
  WHERE NOT EXISTS (
    SELECT 1 FROM q0 WHERE q0.qid = fb.qid AND q0.term = tf.term
  )
  GROUP BY fb.qid, tf.term, df.df, stats.n
),
qx AS (
  SELECT qid, term FROM (
    SELECT qid, term,
           row_number() OVER (PARTITION BY qid ORDER BY w DESC, term ASC) AS rn
    FROM cand
  ) WHERE rn <= {PRF_FB_M}
),
qall AS (
  SELECT qid, term, 1.0 AS wt FROM q0
  UNION ALL
  SELECT qid, term, 0.5 AS wt FROM qx
),
scored AS (
  SELECT qall.qid, tf.doc_id,
         sum(
           qall.wt
           * ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM qall
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY qall.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= {PRF_K}"""


FILTER_LANGS = ["en", "de"]


def bm25_filtered(sf_dir: str) -> pa.Table:
    """Filtered retrieval: the fixture queries restricted to documents with
    lang IN FILTER_LANGS via ``BM25Searcher.search_filtered`` — the
    predicate restricts the match set only (N/avgdl/idf stay global, the
    Elasticsearch bool-filter contract), pushed into the shard actors'
    exclusion channel so pruning stays score-lossless.  (qid, rank,
    doc_id); oracle = the BM25 CTEs with a post-scoring lang join."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    tables = []
    for qid, terms, k in DOC_QUERIES:
        r = searcher.search_filtered(
            " ".join(terms), k=k, filter_col="lang", filter_vals=FILTER_LANGS
        )
        tables.append(
            pa.table(
                {
                    "qid": pa.array(np.full(len(r), qid, dtype=np.int64)),
                    "rank": r["rank"],
                    "doc_id": r["docID"],
                }
            )
        )
    return pa.concat_tables(tables)


def bm25_filtered_sql_oracle() -> str:
    langs = ", ".join(f"'{x}'" for x in FILTER_LANGS)
    return _bm25_ctes() + f"""
, kept_f AS (
  SELECT s.* FROM scored s
  JOIN d0 ON d0.doc_id = s.doc_id
  WHERE d0.lang IN ({langs})
),
ranked_f AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM kept_f
)
SELECT qid, rank, doc_id FROM ranked_f WHERE rank <= 10"""


EXPLAIN_DOCS = 3  # per query: top docs whose scores get term-level breakdowns


def bm25_explain(sf_dir: str) -> pa.Table:
    """Score explanation (Lucene ``explain`` analogue): per-term BM25
    contribution breakdown for each fixture query's top EXPLAIN_DOCS docs.

    (qid, doc_id, term, contrib_e6) — contrib = idf(t) * tf*(k1+1) /
    (tf + k1*(1-b+b*dl/avgdl)), integer-lifted with the same
    floor(x*1e6+0.5) rule as ``bm25_scores``.  tf comes from re-tokenizing
    the fetched doc (predicate-pushdown read), dl/N/avgdl/df from the
    index's own stats/lexicon — so the oracle pins the statistics the
    engine scored with, term by term; the pytest additionally pins
    sum(contribs) == the shard scorer's score bitwise (same accumulation
    order)."""
    from collections import Counter

    import pyarrow.dataset as pads

    from ..functions.tokenize import split_tokens

    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), EXPLAIN_DOCS) for _, terms, _ in DOC_QUERIES]
    )
    all_ids = sorted({d for r in results for d in r["docID"].to_pylist()})
    texts = {}
    if all_ids:
        tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
            columns=["doc_id", "text"], filter=pads.field("doc_id").isin(all_ids)
        )
        texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    n = searcher.stats["N"]
    avgdl = float(searcher.stats["avgdl"])
    rows: dict[str, list] = {"qid": [], "doc_id": [], "term": [], "contrib_e6": []}
    for (qid, terms, _), r in zip(DOC_QUERIES, results):
        weights = searcher.lexicon.idf(terms)
        for did in r["docID"].to_pylist():
            toks = split_tokens(pa.array([texts[did]]), "simple")[0].as_py()
            tf = Counter(t for t in toks if t)
            dl = sum(tf.values())
            for t in terms:
                if t not in weights or tf.get(t, 0) == 0:
                    continue
                idf = weights[t][1]
                c = idf * (tf[t] * 2.2) / (tf[t] + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
                rows["qid"].append(qid)
                rows["doc_id"].append(did)
                rows["term"].append(t)
                rows["contrib_e6"].append(int(np.floor(c * 1e6 + 0.5)))
    return pa.table(
        {
            "qid": pa.array(rows["qid"], pa.int64()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "term": pa.array(rows["term"], pa.string()),
            "contrib_e6": pa.array(rows["contrib_e6"], pa.int64()),
        }
    )


def bm25_explain_sql_oracle() -> str:
    return _bm25_ctes() + f"""
SELECT r.qid, r.doc_id, tf.term,
       CAST(floor(
         ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
         * (tf.tf * 2.2)
         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         * 1000000 + 0.5) AS BIGINT) AS contrib_e6
FROM ranked r
JOIN q ON q.qid = r.qid
JOIN tf ON tf.doc_id = r.doc_id AND tf.term = q.term
JOIN df ON df.term = q.term
JOIN dl ON dl.doc_id = r.doc_id
CROSS JOIN stats
WHERE r.rank <= {EXPLAIN_DOCS}"""


def match_stats(sf_dir: str) -> pa.Table:
    """Numeric stats aggregation over each fixture query's FULL match set:
    exact (n_docs, sum/min/max of n_chars) via shard-pushed-down
    ``BM25Searcher.match_stats`` — four integers per query leave each
    shard.  qid 5 (nonexistent terms) keeps its row with n_docs = 0 and
    NULL min/max, mirroring SQL aggregate semantics."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    t = searcher.match_stats(
        [" ".join(terms) for _, terms, _ in DOC_QUERIES], value_col="n_chars"
    )
    # fixture qids are 1..n in DOC_QUERIES order, same as match_stats' qid
    return t


def match_stats_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    qids = ", ".join(f"({qid})" for qid, _, _ in DOC_QUERIES)
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ),
        t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        q(qid, term) AS (VALUES {values}),
        allq(qid) AS (VALUES {qids}),
        m AS (SELECT DISTINCT q.qid, t.doc_id FROM q JOIN t USING (term)),
        s AS (
          SELECT m.qid,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(d.n_chars) AS BIGINT) AS sum_val,
                 CAST(min(d.n_chars) AS BIGINT) AS min_val,
                 CAST(max(d.n_chars) AS BIGINT) AS max_val
          FROM m JOIN documents d USING (doc_id)
          GROUP BY m.qid
        )
        SELECT allq.qid,
               coalesce(s.n_docs, 0) AS n_docs,
               coalesce(s.sum_val, 0) AS sum_val,
               s.min_val, s.max_val
        FROM allq LEFT JOIN s USING (qid)
    """


RANGE_LO, RANGE_HI = 200, 900  # n_chars bounds for the range-filter fixture


def bm25_range(sf_dir: str) -> pa.Table:
    """Range-filtered retrieval: the fixture queries restricted to docs
    with n_chars in [RANGE_LO, RANGE_HI] via ``BM25Searcher.search_range``
    (numeric twin of ``bm25_filtered``; match-set restriction only, global
    statistics untouched).  (qid, rank, doc_id)."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    tables = []
    for qid, terms, k in DOC_QUERIES:
        r = searcher.search_range(
            " ".join(terms), k=k, value_col="n_chars", lo=RANGE_LO, hi=RANGE_HI
        )
        tables.append(
            pa.table(
                {
                    "qid": pa.array(np.full(len(r), qid, dtype=np.int64)),
                    "rank": r["rank"],
                    "doc_id": r["docID"],
                }
            )
        )
    return pa.concat_tables(tables)


def bm25_range_sql_oracle() -> str:
    return _bm25_ctes() + f"""
, kept_r AS (
  SELECT s.* FROM scored s
  JOIN d0 ON d0.doc_id = s.doc_id
  WHERE d0.n_chars BETWEEN {RANGE_LO} AND {RANGE_HI}
),
ranked_r AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM kept_r
)
SELECT qid, rank, doc_id FROM ranked_r WHERE rank <= 10"""


TT_DELETE_MOD = 13


def _tt_index(sf_dir: str) -> str:
    """Build (once, marker-cached) the three-snapshot lifecycle index the
    time-travel and snapshot-diff queries share: v1 = even-doc_id half,
    v2 = + odd half appended, v3 = + tombstone-delete doc_id % 13 == 0."""
    import shutil as _shutil

    from .build import append_index
    from .compact import delete_docs

    base = _index_dir_for(sf_dir) + "_tt"
    marker = os.path.join(base, ".tt_done")
    if not os.path.exists(marker):
        _shutil.rmtree(base, ignore_errors=True)
        src = base + "_src"
        _shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        t = pq.read_table(f"{sf_dir}/documents.parquet")
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        even = (ids % 2) == 0
        pq.write_table(t.filter(pa.array(even)), f"{src}/even.parquet")
        pq.write_table(t.filter(pa.array(~even)), f"{src}/odd.parquet")
        cfg = BuildConfig(
            tokenizer="simple",
            text_col="text",
            id_col="doc_id",
            chunk_docs=250_000,
            num_parts=16,
            batch_size=512,
            salt_docs=4096,
        )
        build_index(f"{src}/even.parquet", base, cfg)  # -> v1
        append_index(f"{src}/odd.parquet", base, cfg)  # -> v2
        delete_docs(base, ids[ids % TT_DELETE_MOD == 0])  # -> v3
        with open(marker, "w") as f:
            f.write("done")
    return base


def time_travel_bm25(sf_dir: str) -> pa.Table:
    """Snapshot time travel end to end (``state/snapshots.py``): build the
    index over the even-doc_id half (publishes snapshot v1), append the
    odd half (v2), tombstone-delete ``doc_id % 13 == 0`` (v3) — then run
    the fixture queries AS OF v1 and AS OF v2 on the LIVE index.

    (version, qid, rank, doc_id).  v1 must reproduce a from-scratch BM25
    over the even half alone (the snapshot's frozen N/avgdl and
    hard-linked lexicon, not today's), and v2 the full corpus — even
    though the live index already carries v3's tombstones, which time
    travel must ignore.  The oracle recomputes both from SQL with the
    matching corpus filters.  v3's deferred-delete view (frozen stats,
    masked results — not SQL-expressible as a filtered corpus) is pinned
    bitwise in ``tests/test_snapshots.py``.
    """
    base = _tt_index(sf_dir)
    tables = []
    for version in (1, 2):
        searcher = BM25Searcher(base, snapshot=version)
        results = searcher.search_many(
            [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
        )
        for (qid, _, _), r in zip(DOC_QUERIES, results):
            tables.append(
                pa.table(
                    {
                        "version": pa.array(
                            np.full(len(r), version, dtype=np.int64)
                        ),
                        "qid": pa.array(np.full(len(r), qid, dtype=np.int64)),
                        "rank": r["rank"],
                        "doc_id": r["docID"],
                    }
                )
            )
    return pa.concat_tables(tables)


def time_travel_bm25_sql_oracle() -> str:
    v1 = (
        _bm25_ctes(doc_where="doc_id % 2 = 0")
        + "\nSELECT CAST(1 AS BIGINT) AS version, qid, rank, doc_id "
        "FROM ranked WHERE rank <= 10"
    )
    v2 = (
        _bm25_ctes()
        + "\nSELECT CAST(2 AS BIGINT) AS version, qid, rank, doc_id "
        "FROM ranked WHERE rank <= 10"
    )
    return f"SELECT * FROM ({v1})\nUNION ALL\nSELECT * FROM ({v2})"


def snapshot_diff(sf_dir: str) -> pa.Table:
    """Snapshot DIFF over the same three-version lifecycle index as
    :func:`time_travel_bm25` (``compact.diff_snapshots``): v1 -> v2 must
    report exactly the appended odd-doc_id half as 'added'; v2 -> v3
    exactly the ``doc_id % 13 == 0`` tombstones as 'removed'.

    (from_v, to_v, doc_id, change).  The diff reads only changed chunks'
    docmaps plus the tombstone delta — never the postings; the oracle
    restates both transitions as corpus predicates.
    """
    from .compact import diff_snapshots

    base = _tt_index(sf_dir)
    tables = []
    for vf, vt in ((1, 2), (2, 3)):
        d = diff_snapshots(base, vf, vt)
        t = pa.Table.from_pandas(d.to_pandas(), preserve_index=False)
        tables.append(
            pa.table(
                {
                    "from_v": pa.array(np.full(t.num_rows, vf, np.int64)),
                    "to_v": pa.array(np.full(t.num_rows, vt, np.int64)),
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "change": t["change"],
                }
            )
        )
    return pa.concat_tables(tables)


def snapshot_diff_sql_oracle() -> str:
    return f"""
        SELECT CAST(1 AS BIGINT) AS from_v, CAST(2 AS BIGINT) AS to_v,
               doc_id, 'added' AS change
        FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(3 AS BIGINT), doc_id, 'removed'
        FROM documents WHERE doc_id % {TT_DELETE_MOD} = 0
    """


_TRI_HEX_LUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
TRI_QUERIES = [
    (0, "hash value"),
    (1, "table part"),
    (2, "fast merge"),
    (3, "agg row scan"),
    (4, "no such moose"),  # zero-match literal: AND must empty, not error
]


def _utf8_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes, per-doc relative offsets) of a utf8 array — zero-copy."""
    bufs = arr.buffers()
    off0 = arr.offset
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1 + off0)[off0:]
    if bufs[2] is None:
        return np.empty(0, np.uint8), (offs - offs[0]).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(offs[-1]))[int(offs[0]):]
    return data, (offs - offs[0]).astype(np.int64)


def _derive_trigram_docs(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, text = the doc's DISTINCT lowercased byte
    trigrams, hex-encoded, space-joined).  Hex keeps every byte (spaces,
    punctuation) inside a [0-9a-f]{6} word the frozen ``simple`` tokenizer
    passes through untouched — so the standard index build/search engine
    serves substring search with zero tokenizer changes (the Google Code
    Search trigram design re-expressed over this engine's AND skip-seek).
    Fully vectorized: one byte-window pass, one sort-unique, one LUT hex
    expansion, one Arrow list-join per batch."""
    texts = pc.utf8_lower(pc.fill_null(batch["text"], ""))
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, offs = _utf8_buffers(texts)
    ndocs = len(texts)
    lens = np.diff(offs)
    n_tri = np.maximum(lens - 2, 0)
    total = int(n_tri.sum())
    if total:
        cum_prev = np.concatenate([[0], np.cumsum(n_tri)[:-1]])
        pos = np.arange(total, dtype=np.int64) + np.repeat(
            offs[:-1] - cum_prev, n_tri
        )
        d64 = data.astype(np.int64)
        u32 = d64[pos] * 65536 + d64[pos + 1] * 256 + d64[pos + 2]
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), n_tri)
        key = np.unique((doc_of << 24) | u32)
        doc_u, tri_u = key >> 24, key & 0xFFFFFF
    else:
        doc_u = np.empty(0, np.int64)
        tri_u = np.empty(0, np.int64)
    shifts = np.array([20, 16, 12, 8, 4, 0], dtype=np.int64)
    nib = (tri_u[:, None] >> shifts[None, :]) & 0xF
    hexdata = _TRI_HEX_LUT[nib].ravel()
    tok_offs = (np.arange(len(tri_u) + 1, dtype=np.int32) * 6)
    flat = pa.Array.from_buffers(
        pa.utf8(), len(tri_u), [None, pa.py_buffer(tok_offs), pa.py_buffer(hexdata)]
    )
    cnt = np.bincount(doc_u, minlength=ndocs).astype(np.int32)
    voffs = np.zeros(ndocs + 1, dtype=np.int32)
    np.cumsum(cnt, out=voffs[1:])
    la = pa.ListArray.from_arrays(pa.array(voffs, pa.int32()), flat)
    return pa.table(
        {"doc_id": batch["doc_id"], "text": pc.binary_join(la, " ")}
    )


def _literal_trigrams(lit: str) -> list[str]:
    b = lit.lower().encode("utf-8")
    if len(b) < 3:
        raise ValueError("trigram search needs a literal of >= 3 bytes")
    return sorted({b[i : i + 3].hex() for i in range(len(b) - 2)})


def trigram_search(sf_dir: str) -> pa.Table:
    """Indexed substring search (grep over the corpus without a full scan):
    a DERIVED trigram column indexes through the unchanged build engine;
    a literal query becomes a conjunctive (AND skip-seek) probe over its
    trigrams, and only the surviving candidates are read back and verified
    with an exact substring test — the classic trigram-index code-search
    plan.  (qid, doc_id) — the FULL exact match set, so the oracle is a
    plain ``contains(lower(text), literal)`` scan.

    Scale shape: the derived column is built once (one streaming pass,
    vectorized trigram extraction); candidate verification reads only
    candidate docs (broadcast id filter pushed into the scan).  False
    positives (docs with all trigrams but not the contiguous literal) are
    removed by the verify; false negatives are impossible — every
    substring occurrence contributes all its trigrams."""
    from .text import docs_dataset

    searcher = _trigram_index(sf_dir)
    n = int(searcher.stats["N"])
    cand: dict[int, np.ndarray] = {}
    prepared = [
        (qid, " ".join(_literal_trigrams(lit))) for qid, lit in TRI_QUERIES
    ]
    results = searcher.search_many(
        [(q, n) for _, q in prepared], mode="and"
    )
    for (qid, _), r in zip(prepared, results):
        ids = r["docID"].to_numpy(zero_copy_only=False)
        if len(ids):
            cand[qid] = np.sort(ids)
    lits = {qid: lit.lower() for qid, lit in TRI_QUERIES}
    cand_ref = ray.put(cand)

    def verify(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cand_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        low = pc.utf8_lower(pc.fill_null(batch["text"], ""))
        out_q, out_d = [], []
        for qid, ids_q in cmap.items():
            pos = np.searchsorted(ids_q, ids)
            pos[pos >= len(ids_q)] = len(ids_q) - 1
            mask = ids_q[pos] == ids
            if not mask.any():
                continue
            hit = pc.match_substring(
                low.filter(pa.array(mask)), lits[qid]
            ).to_numpy(zero_copy_only=False)
            sel = ids[mask][hit]
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_d.append(sel)
        if not out_q:
            return pa.table(
                {"qid": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
            }
        )

    t = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(verify, batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    t = t.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(t, preserve_index=False).cast(
        pa.schema([("qid", pa.int64()), ("doc_id", pa.int64())])
    )


def trigram_search_sql_oracle() -> str:
    values = ", ".join(f"({qid}, '{lit.lower()}')" for qid, lit in TRI_QUERIES)
    return f"""
        WITH q(qid, lit) AS (VALUES {values})
        SELECT CAST(q.qid AS BIGINT) AS qid, d.doc_id
        FROM q JOIN documents d ON contains(lower(d.text), q.lit)
        ORDER BY qid, doc_id
    """


TRI_RE_QUERIES = [
    (0, "hash .*merge"),           # two prunable literal segments
    (1, "table part|table row"),   # top-level alternation: OR of AND-probes
    (2, "slo. filter"),            # '.' wildcard splits the literal
    (3, "agg (row|line) scan"),    # grouped: unanalyzable -> honest full scan
    (4, "zz9qq.*never"),           # zero matches (trigram AND prunes to none)
]
_RE_WILDCARD = __import__("re").compile(r"\.\*|\.\+|\.")
_RE_META = set("[](){}?+*\\^$")


def _regex_required_trigrams(pattern: str) -> list[list[str]] | None:
    """Per-alternation-branch required-trigram term lists for a RESTRICTED
    regex (literals, ``.`` / ``.*`` / ``.+`` wildcards, top-level ``|``) —
    the Cox code-search query analysis: a match of ``litA.*litB`` must
    contain every trigram of both literals, so candidates are an AND-probe
    per branch, OR-ed across branches.  Returns None when the pattern uses
    syntax the analyzer does not model (groups, classes, anchors) or some
    branch has no >=3-byte literal — the caller then scans the full corpus
    (verification is exact either way; pruning is only an optimization)."""
    if "(" in pattern or ")" in pattern:
        return None
    out = []
    for branch in pattern.lower().split("|"):
        segs = _RE_WILDCARD.split(branch)
        if any(c in _RE_META for s in segs for c in s):
            return None
        tris = sorted({t for s in segs if len(s.encode()) >= 3
                       for t in _literal_trigrams(s)})
        if not tris:
            return None
        out.append(tris)
    return out


def _trigram_index(sf_dir: str) -> BM25Searcher:
    """Build-once (marker-gated) trigram index over the documents table;
    shared by ``trigram_search`` and ``trigram_regex``."""
    from .text import docs_dataset

    base = _index_dir_for(sf_dir) + "_tri"
    marker = os.path.join(base, ".tri_done")
    if not os.path.exists(marker):
        import shutil as _shutil

        _shutil.rmtree(base, ignore_errors=True)
        derived = os.path.join(base, "derived")
        os.makedirs(derived)
        docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
            _derive_trigram_docs, batch_format="pyarrow", batch_size=512
        ).write_parquet(derived)
        cfg = BuildConfig(
            tokenizer="simple",
            text_col="text",
            id_col="doc_id",
            chunk_docs=250_000,
            num_parts=16,
            batch_size=512,
            salt_docs=4096,
        )
        build_index(derived, os.path.join(base, "idx"), cfg)
        with open(marker, "w") as f:
            f.write("done")
    return BM25Searcher(os.path.join(base, "idx"))


def trigram_regex(sf_dir: str) -> pa.Table:
    """Indexed REGEX search: restricted patterns are analyzed into
    required-trigram AND-probes (per alternation branch, OR-ed), the
    trigram index prunes candidates, and an exact ``re.search`` over the
    lowercased text verifies — grep semantics without a full scan when
    the pattern carries literals.  Unanalyzable patterns (grouping,
    classes) honestly scan everything.  (qid, doc_id), full match set;
    oracle = DuckDB ``regexp_matches`` over the corpus."""
    import re as _re

    from .text import docs_dataset

    searcher = _trigram_index(sf_dir)
    n = int(searcher.stats["N"])
    cand: dict[int, np.ndarray | None] = {}
    for qid, pat in TRI_RE_QUERIES:
        branches = _regex_required_trigrams(pat)
        if branches is None:
            cand[qid] = None  # full-scan branch
            continue
        results = searcher.search_many(
            [(" ".join(tris), n) for tris in branches], mode="and"
        )
        ids = np.unique(
            np.concatenate(
                [r["docID"].to_numpy(zero_copy_only=False) for r in results]
            )
        ) if results else np.empty(0, np.int64)
        if len(ids):
            cand[qid] = np.sort(ids)
        # a fully-pruned pattern needs no verify pass at all
    pats = {qid: pat.lower() for qid, pat in TRI_RE_QUERIES}
    cand_ref = ray.put(cand)
    pats_ref = ray.put(pats)

    def verify(batch: pa.Table) -> pa.Table:
        cmap, pmap = ray.get(cand_ref), ray.get(pats_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        low = pc.utf8_lower(pc.fill_null(batch["text"], ""))
        out_q, out_d = [], []
        for qid, ids_q in cmap.items():
            if ids_q is None:
                mask = np.ones(len(ids), dtype=bool)
            else:
                pos = np.searchsorted(ids_q, ids)
                pos[pos >= len(ids_q)] = len(ids_q) - 1
                mask = ids_q[pos] == ids if len(ids_q) else np.zeros(len(ids), bool)
            if not mask.any():
                continue
            rx = _re.compile(pmap[qid])
            texts = low.filter(pa.array(mask)).to_pylist()
            hit = np.fromiter(
                (rx.search(t) is not None for t in texts),
                dtype=bool,
                count=len(texts),
            )
            sel = ids[mask][hit]
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_d.append(sel)
        if not out_q:
            return pa.table(
                {"qid": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
            }
        )

    t = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(verify, batch_format="pyarrow", batch_size=512)
        .to_pandas()
    )
    t = t.sort_values(["qid", "doc_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(t, preserve_index=False).cast(
        pa.schema([("qid", pa.int64()), ("doc_id", pa.int64())])
    )


def trigram_regex_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{pat.lower()}')" for qid, pat in TRI_RE_QUERIES
    )
    return f"""
        WITH q(qid, pat) AS (VALUES {values})
        SELECT CAST(q.qid AS BIGINT) AS qid, d.doc_id
        FROM q JOIN documents d ON regexp_matches(lower(d.text), q.pat)
        ORDER BY qid, doc_id
    """


# routed queries: (qid, routing key = lang, terms, k)
ROUTED_QUERIES: list[tuple[int, str, list[str], int]] = [
    (1, "en", ["fast", "key", "merge", "sort"], 10),
    (2, "de", ["group", "query", "spark"], 10),
    (3, "es", ["customer", "filter", "stream"], 10),
    (4, "fr", ["scan", "table", "window"], 10),
    (5, "zh", ["nonexistentterm", "xyzzy"], 10),
]


def _routed_indexes(sf_dir: str) -> dict[str, str]:
    """One self-contained index per lang routing key (marker-cached)."""
    import pyarrow.dataset as pads

    base = _index_dir_for(sf_dir)
    dsx = pads.dataset(f"{sf_dir}/documents.parquet")
    langs = sorted(
        set(dsx.to_table(columns=["lang"])["lang"].to_pylist())
    )
    routes: dict[str, str] = {}
    for lang in langs:
        pdir = f"{base}_route_{lang}"
        src_dir = f"{pdir}_src"
        src = os.path.join(src_dir, "documents.parquet")
        if not os.path.exists(src):
            os.makedirs(src_dir, exist_ok=True)
            pq.write_table(
                dsx.to_table(filter=pads.field("lang") == lang), src
            )
        cfg = BuildConfig(
            tokenizer="simple",
            text_col="text",
            id_col="doc_id",
            chunk_docs=250_000,
            num_parts=8,
            batch_size=512,
            salt_docs=4096,
        )
        build_index(src, pdir, cfg)
        routes[lang] = pdir
    return routes


def routed_bm25(sf_dir: str) -> pa.Table:
    """Routing-key partitioned retrieval (``query.RoutedBM25``): the
    corpus is split into one index per ``lang`` and each fixture query
    carries a routing key — only THAT partition is probed, and it scores
    with its own partition-local (N, df, avgdl).

    (qid, rank, doc_id).  The oracle recomputes each query's BM25 over
    the corpus restricted to its routing lang (``doc_where``), which is
    exactly what per-partition statistics mean.
    """
    from .query import RoutedBM25

    routed = RoutedBM25(_routed_indexes(sf_dir))
    tables = []
    for qid, lang, terms, k in ROUTED_QUERIES:
        r = routed.search(lang, " ".join(terms), k=k)
        tables.append(
            r.add_column(
                0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64))
            )
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def routed_bm25_sql_oracle() -> str:
    parts = []
    for qid, lang, terms, k in ROUTED_QUERIES:
        ctes = _bm25_ctes(
            queries=[(qid, terms, k)], doc_where=f"lang = '{lang}'"
        )
        parts.append(
            f"SELECT qid, rank, doc_id FROM ({ctes}\n"
            f"SELECT qid, rank, doc_id FROM ranked WHERE rank <= {k})"
        )
    return "\nUNION ALL\n".join(parts)


TV_DOC_MOD = 100  # fixture probe: every 100th doc_id


def term_vectors_q(sf_dir: str) -> pa.Table:
    """Stored term vectors end to end: a ``term_vectors=True`` build writes
    the forward index (tvec/ sidecars) alongside the postings, and
    ``query.term_vectors`` probes it for the fixture docs — (doc_id,
    term, tf), one row per distinct term of each probed document.

    The oracle recomputes the same rows by tokenizing the probed docs in
    SQL; the engine side must agree exactly (tf included), which pins the
    sidecar to the SAME tokenization that built the postings.
    """
    from .query import term_vectors

    out = _index_dir_for(sf_dir) + "_tv"
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=8,
        batch_size=512,
        salt_docs=4096,
        term_vectors=True,
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_numpy(zero_copy_only=False)
    probe = sorted(int(i) for i in ids if i % TV_DOC_MOD == 0)
    t = term_vectors(out, probe)
    return pa.table(
        {
            "doc_id": t["docID"],
            "term": t["term"],
            "tf": t["tf"],
        }
    )


def term_vectors_sql_oracle() -> str:
    return f"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents WHERE doc_id % {TV_DOC_MOD} = 0
        )
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM tok WHERE term <> ''
        GROUP BY doc_id, term
    """


def bm25f_topk(sf_dir: str) -> pa.Table:
    """True BM25F ranking over the head/body field split (first 8 tokens
    vs rest): per-field length-normalized tf, weight-blended BEFORE the
    k1 saturation (``query._score_chunk_bm25f``) — the genuinely
    different ranking from ``bm25_head_boost``'s add-two-BM25-scores.
    Same ``head_tokens=8`` index as the boost query (build reused);
    (qid, rank, doc_id); the oracle recomputes BM25F from SQL.
    """
    searcher = BM25Searcher(documents_head_index(sf_dir))
    results = searcher.search_many_f(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES],
        w_head=2.0,
        w_body=1.0,
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25f_sql_oracle() -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT doc_id, unnest(toks) AS term FROM arr),
th AS (SELECT doc_id, unnest(toks[1:8]) AS term FROM arr),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
tfh AS (SELECT doc_id, term, count(*) AS tf FROM th GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
fl AS (
  -- n counts ALL documents (a zero-token doc adds 0 to the length sums
  -- but still counts in N/avg, exactly like the engine's dense doclen)
  SELECT (SELECT count(*) FROM documents) AS n,
         sum(least(dl, 8)) * 1.0 / (SELECT count(*) FROM documents) AS avg_h,
         (sum(dl) - sum(least(dl, 8))) * 1.0
           / (SELECT count(*) FROM documents) AS avg_b
  FROM dl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
q(qid, term) AS (VALUES {values}),
tfw AS (
  SELECT q.qid, tf.doc_id, tf.term,
         (1.0 * (tf.tf - coalesce(tfh.tf, 0)))
           / (0.25 + 0.75 * (dl.dl - least(dl.dl, 8)) / fl.avg_b)
         + (2.0 * coalesce(tfh.tf, 0))
           / (0.25 + 0.75 * least(dl.dl, 8) / fl.avg_h) AS w
  FROM q
  JOIN tf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  LEFT JOIN tfh ON tfh.doc_id = tf.doc_id AND tfh.term = tf.term
  CROSS JOIN fl
),
scored AS (
  SELECT tfw.qid, tfw.doc_id,
         sum(
           ln((fl.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * ((tfw.w * 2.2) / (tfw.w + 1.2))
         ) AS score
  FROM tfw
  JOIN df ON df.term = tfw.term
  CROSS JOIN fl
  GROUP BY tfw.qid, tfw.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""


# phrase-suggest fixtures: whole-phrase typo corrections
PHRASE_SUGGEST_QUERIES: list[tuple[int, str]] = [
    (1, "fust merge sort"),   # fust -> fast (substitution)
    (2, "sow tabl scan"),     # sow -> {slow, row} (ambiguous), tabl -> table
    (3, "spark quer"),        # quer -> query (deletion)
]
PHRASE_TOPN = 3


def phrase_suggest(sf_dir: str) -> pa.Table:
    """Elasticsearch-style PHRASE suggester ("did you mean" for whole
    queries): per-slot candidates are the SymSpell Levenshtein<=1
    neighborhood of each query word (``Lexicon.fuzzy_terms`` — same
    expansion as ``spell_suggest``), composed into candidate phrases and
    ranked by adjacent-bigram corpus support — score = sum over adjacent
    slot pairs of the bigram's corpus frequency (integer-exact).

    (qid, rank, suggestion, score), top ``PHRASE_TOPN`` per query,
    (score DESC, suggestion ASC) ties.  Engine shape: candidate pairs
    are broadcast and ONE vectorized corpus pass (the same
    ``_BigramPartials`` kernel as ``bigram_counts``, filtered to the
    candidate set before the groupby) counts their support — no full
    bigram table materializes at query time; a serving platform would
    precompute it once and this becomes a pure lookup.
    """
    import itertools

    from .build import load_stats
    from .query import Lexicon
    from .text import _BigramPartials, docs_dataset
    from ..util import stage_fn
    from ray.data.aggregate import Sum

    out = documents_index(sf_dir)
    lex = Lexicon(out, load_stats(out)["N"])
    slot_cands: dict[int, list[list[str]]] = {}
    pair_set: set[str] = set()
    for qid, q in PHRASE_SUGGEST_QUERIES:
        slots = [sorted(lex.fuzzy_terms(w)) for w in q.split()]
        slot_cands[qid] = slots
        for a, b in zip(slots, slots[1:]):
            pair_set.update(f"{x} {y}" for x in a for y in b)
    want = sorted(pair_set)

    counts_ds = (
        docs_dataset(sf_dir, ["doc_id", "text"])
        .map_batches(
            stage_fn(_BigramPartials), batch_format="pyarrow", batch_size=512
        )
        .map_batches(
            lambda t, w=want: t.filter(pc.is_in(t["bigram"], pa.array(w))),
            batch_format="pyarrow",
        )
        .groupby("bigram")
        .aggregate(Sum("cf_part", alias_name="cf"))
    )
    cf_tbl = pa.Table.from_pandas(counts_ds.to_pandas(), preserve_index=False)
    cf = dict(zip(cf_tbl["bigram"].to_pylist(), cf_tbl["cf"].to_pylist()))

    rows = {"qid": [], "rank": [], "suggestion": [], "score": []}
    for qid, _ in PHRASE_SUGGEST_QUERIES:
        scored = []
        for combo in itertools.product(*slot_cands[qid]):
            s = sum(
                int(cf.get(f"{a} {b}", 0)) for a, b in zip(combo, combo[1:])
            )
            scored.append((" ".join(combo), s))
        scored.sort(key=lambda r: (-r[1], r[0]))
        for i, (phrase, s) in enumerate(scored[:PHRASE_TOPN], 1):
            rows["qid"].append(qid)
            rows["rank"].append(i)
            rows["suggestion"].append(phrase)
            rows["score"].append(s)
    return pa.table(
        {
            "qid": pa.array(rows["qid"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
            "suggestion": pa.array(rows["suggestion"], pa.string()),
            "score": pa.array(rows["score"], pa.int64()),
        }
    )


def phrase_suggest_sql_oracle() -> str:
    parts = []
    for qid, q in PHRASE_SUGGEST_QUERIES:
        words = q.split()
        srcs = [
            f"(SELECT term AS t{i} FROM voc WHERE levenshtein('{w}', term) <= 1) c{i}"
            for i, w in enumerate(words)
        ]
        frm = srcs[0] + "".join(f"\n          CROSS JOIN {s}" for s in srcs[1:])
        joins = "".join(
            f"\n          LEFT JOIN big b{i} ON b{i}.bigram = t{i} || ' ' || t{i+1}"
            for i in range(len(words) - 1)
        )
        sugg = " || ' ' || ".join(f"t{i}" for i in range(len(words)))
        score = " + ".join(
            f"coalesce(b{i}.cf, 0)" for i in range(len(words) - 1)
        )
        parts.append(
            f"""SELECT CAST({qid} AS BIGINT) AS qid, {sugg} AS suggestion,
                 CAST({score} AS BIGINT) AS score
          FROM {frm}{joins}"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
        WITH arr AS (
          SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        t AS (SELECT unnest(toks) AS term FROM arr),
        voc AS (SELECT DISTINCT term FROM t),
        b AS (
          SELECT unnest(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM arr
        ),
        big AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cf FROM b GROUP BY 1),
        allc AS (
          {union}
        ),
        ranked AS (
          SELECT qid, suggestion, score,
                 CAST(row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, suggestion ASC
                 ) AS BIGINT) AS rank
          FROM allc
        )
        SELECT qid, rank, suggestion, score FROM ranked WHERE rank <= {PHRASE_TOPN}
    """


def nrt_search(sf_dir: str) -> pa.Table:
    """Near-real-time search (``query.NRTSearcher``): the even-doc_id half
    is durably indexed, the odd half is only BUFFERED in the realtime
    segment (zero flushes) — and the fixture queries must already rank
    the full corpus exactly as a fused from-scratch index would, because
    the (N, df, avgdl) merge is exact and the disk shards score under
    the merged avgdl.  (qid, rank, doc_id); the oracle is deliberately
    the plain full-corpus BM25 SQL — NRT buffering must be invisible.
    """
    import pyarrow.dataset as pads

    from .query import NRTSearcher

    base = _index_dir_for(sf_dir) + "_nrt"
    src_dir = base + "_src"
    src = os.path.join(src_dir, "even.parquet")
    dsx = pads.dataset(f"{sf_dir}/documents.parquet")
    if not os.path.exists(src):
        os.makedirs(src_dir, exist_ok=True)
        t_all = dsx.to_table()
        ids_all = t_all["doc_id"].to_numpy(zero_copy_only=False)
        pq.write_table(t_all.filter(pa.array(ids_all % 2 == 0)), src)
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=8,
        batch_size=512,
        salt_docs=4096,
    )
    build_index(src, base, cfg)
    nrt = NRTSearcher(base, text_col="text", id_col="doc_id")
    t_all = dsx.to_table()
    ids_all = t_all["doc_id"].to_numpy(zero_copy_only=False)
    nrt.add(t_all.filter(pa.array(ids_all % 2 == 1)))
    results = nrt.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def nrt_search_sql_oracle() -> str:
    return _bm25_ctes() + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"


def snapshot_rollback_bm25(sf_dir: str) -> pa.Table:
    """Snapshot ROLLBACK end to end (``state/snapshots.py``): build the
    even half (v1), append the odd half (v2), tombstone-delete
    ``doc_id % 13 == 0`` (v3) — then ``rollback_to_snapshot(v2)`` and
    search the LIVE index with plain readers.  The bad delete must be
    fully undone: (qid, rank, doc_id) equals full-corpus BM25 (the same
    deliberately-plain oracle as ``nrt_search`` — a rollback must be
    invisible in the output).
    """
    import shutil as _shutil

    from .build import append_index
    from .compact import delete_docs
    from ..state.snapshots import rollback_to_snapshot

    base = _index_dir_for(sf_dir) + "_rb"
    marker = os.path.join(base, ".rb_done")
    if not os.path.exists(marker):
        _shutil.rmtree(base, ignore_errors=True)
        src = base + "_src"
        _shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        t = pq.read_table(f"{sf_dir}/documents.parquet")
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        even = (ids % 2) == 0
        pq.write_table(t.filter(pa.array(even)), f"{src}/even.parquet")
        pq.write_table(t.filter(pa.array(~even)), f"{src}/odd.parquet")
        cfg = BuildConfig(
            tokenizer="simple",
            text_col="text",
            id_col="doc_id",
            chunk_docs=250_000,
            num_parts=8,
            batch_size=512,
            salt_docs=4096,
        )
        build_index(f"{src}/even.parquet", base, cfg)   # -> v1
        append_index(f"{src}/odd.parquet", base, cfg)   # -> v2
        delete_docs(base, ids[ids % TT_DELETE_MOD == 0])  # -> v3 (the mistake)
        rollback_to_snapshot(base, 2)                   # undo it
        with open(marker, "w") as f:
            f.write("done")
    searcher = BM25Searcher(base)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def snapshot_rollback_sql_oracle() -> str:
    return _bm25_ctes() + "\nSELECT qid, rank, doc_id FROM ranked WHERE rank <= 10"


def function_score_bm25(sf_dir: str) -> pa.Table:
    """Function-score retrieval (``BM25Searcher.search_function``): BM25
    multiplied by the per-doc prior ``1 + ln(1 + n_chars/1000)`` — the
    Elasticsearch ``field_value_factor`` pattern (boost longer docs).
    (qid, rank, doc_id); the oracle recomputes BM25 x the same factor.
    """
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    tables = []
    for qid, terms, k in DOC_QUERIES:
        r = searcher.search_function(" ".join(terms), k=k)
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def function_score_sql_oracle() -> str:
    return _bm25_ctes() + """,
f AS (
  SELECT s.qid, s.doc_id,
         s.score * (1.0 + ln(1.0 + d.n_chars / 1000.0)) AS fscore
  FROM scored s JOIN documents d USING (doc_id)
),
r2 AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY fscore DESC, doc_id ASC) AS BIGINT) AS rank
  FROM f
)
SELECT qid, rank, doc_id FROM r2 WHERE rank <= 10"""


SORTBY_QUERIES: list[tuple[int, str]] = [
    (1, "merge sort"),
    (2, "spark window"),
]


def sort_by_field(sf_dir: str, k: int = 10) -> pa.Table:
    """Sort-by-field retrieval (``BM25Searcher.search_sorted_by``): the
    top-k docs matching each fixture query ordered by ``n_chars`` DESC
    instead of BM25 — the Elasticsearch ``sort`` clause.  (qid, rank,
    doc_id, n_chars); oracle: the OR match set joined to documents,
    ranked by (n_chars DESC, doc_id ASC).
    """
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    tables = []
    for qid, q in SORTBY_QUERIES:
        r = searcher.search_sorted_by(q, k=k, value_col="n_chars", desc=True)
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "n_chars"])


def sort_by_field_sql_oracle(k: int = 10) -> str:
    parts = []
    for qid, q in SORTBY_QUERIES:
        terms = ", ".join(f"'{w}'" for w in sorted(set(q.split())))
        parts.append(f"""
        SELECT CAST({qid} AS BIGINT) AS qid, rank, doc_id, n_chars FROM (
          SELECT m.doc_id, d.n_chars,
                 CAST(row_number() OVER (
                   ORDER BY d.n_chars DESC, m.doc_id ASC
                 ) AS BIGINT) AS rank
          FROM (
            SELECT DISTINCT doc_id FROM (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
              FROM documents
            ) WHERE term IN ({terms})
          ) m JOIN documents d USING (doc_id)
        ) WHERE rank <= {k}""")
    return "\nUNION ALL\n".join(parts)


def hapax_stats(sf_dir: str) -> pa.Table:
    """Hapax legomena analysis straight off the MERGED LEXICON (no corpus
    pass): how many vocabulary terms occur in exactly one document — the
    classic Zipf-tail corpus-quality signal (a crawl full of boilerplate
    has few; OCR noise has many).  (n_terms, n_hapax, hapax_x10000);
    the share is integer-lifted as floor(10000 * hapax / terms).

    The lexicon shards are the already-built (term, df, cf) table, so
    this is one streamed read + a count — the reason the engine keeps
    its dictionary as parquet rather than an opaque blob.
    """
    out = documents_index(sf_dir)
    lex = sorted(glob.glob(os.path.join(out, "lexicon", "*.parquet")))

    def partial(t: pa.Table) -> pa.Table:
        df = t["df"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_part": pa.array([len(df)], pa.int64()),
                "h_part": pa.array([int((df == 1).sum())], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(lex)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(agg["n_part"].sum())
    h = int(agg["h_part"].sum())
    return pa.table(
        {
            "n_terms": pa.array([n], pa.int64()),
            "n_hapax": pa.array([h], pa.int64()),
            "hapax_x10000": pa.array(
                [(10000 * h) // n if n else 0], pa.int64()
            ),
        }
    )


def hapax_stats_sql_oracle() -> str:
    return """
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
          FROM documents
        ), t AS (SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''),
        df AS (SELECT term, count(*) AS df FROM t GROUP BY term)
        SELECT CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
               CAST((10000 * sum(CASE WHEN df = 1 THEN 1 ELSE 0 END))
                    // count(*) AS BIGINT) AS hapax_x10000
        FROM df
    """


STYLE_ENUM_LEVELS = (4, 16, 64)
STYLE_ENUM_WEIGHTS = (1.0, 1.25, 1.5, 2.0)


def bm25_style_enum(sf_dir: str) -> pa.Table:
    """BM25 over a 2-bit style-enum index — the reference's 4-class
    per-posting style field (Normal/Heading/Italic/Bold,
    ``/root/reference/index.h:44-49``) widened onto the wire as
    ``(tf << 2) | class``.  Classes by first-occurrence depth (ordinal
    p < 4 -> 3, < 16 -> 2, < 64 -> 1, else 0); class c scores with
    ``tf * w[c]`` at rank time, w = (1.0, 1.25, 1.5, 2.0).  Returns
    (qid, rank, doc_id); the oracle mirrors the class assignment and tf
    inflation in SQL."""
    out = _index_dir_for(sf_dir) + "_style_enum"
    cfg = BuildConfig(
        tokenizer="simple",
        text_col="text",
        id_col="doc_id",
        chunk_docs=250_000,
        num_parts=16,
        batch_size=512,
        salt_docs=4096,
        style_levels=STYLE_ENUM_LEVELS,
    )
    build_index(f"{sf_dir}/documents.parquet", out, cfg)
    searcher = BM25Searcher(out)
    results = searcher.search_many(
        [(" ".join(terms), k) for _, terms, k in DOC_QUERIES],
        style_weight=STYLE_ENUM_WEIGHTS,
    )
    tables = []
    for (qid, _, _), r in zip(DOC_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def bm25_style_enum_sql_oracle(
    levels: tuple = STYLE_ENUM_LEVELS, weights: tuple = STYLE_ENUM_WEIGHTS
) -> str:
    """BM25 with tf' = tf * w[class], class from the (doc, term) pair's
    first-occurrence ordinal vs the three level thresholds — the SQL
    mirror of the 2-bit style-enum semantics (weight inside the tf
    saturation, df/dl/avgdl untouched)."""
    h1, h2, h3 = levels
    w0, w1, w2, w3 = weights
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT doc_id, unnest(toks) AS term FROM arr),
occ AS (
  SELECT doc_id, toks[u.i] AS term, u.i - 1 AS p
  FROM arr, unnest(range(1, len(toks) + 1)) AS u(i)
),
firstp AS (SELECT doc_id, term, min(p) AS p FROM occ GROUP BY doc_id, term),
w AS (
  SELECT doc_id, term,
         CASE WHEN p < {h1} THEN {w3!r}
              WHEN p < {h2} THEN {w2!r}
              WHEN p < {h3} THEN {w1!r}
              ELSE {w0!r} END AS w
  FROM firstp
),
tf0 AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
tf AS (
  SELECT tf0.doc_id, tf0.term, tf0.tf * w.w AS tf
  FROM tf0 JOIN w USING (doc_id, term)
),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
q(qid, term) AS (VALUES {values}),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""


DISMAX_TIE = 0.3
DISMAX_W_HEAD = 2.0
DISMAX_W_BODY = 1.0


def dismax_search(sf_dir: str) -> pa.Table:
    """Elasticsearch-style ``dis_max`` over two subqueries on one index:
    the plain content query and the head-namespace-scoped query
    (``search(field="head")`` over the same ``head_tokens=8`` build the
    BM25F/boost queries reuse).  Per document,

        score = max(w_h * S_head, w_b * S_body)
                + tie * (the other subscore)

    — the best-field model (winner takes the score, the loser contributes
    only through the tie breaker), genuinely different from both
    ``bm25_head_boost`` (sum of subscores) and ``bm25f_topk`` (per-field
    tf blended before saturation).  (qid, rank, doc_id), ties
    (score DESC, doc ASC); the oracle recomposes both subscores in SQL.

    Scale note: the combine here materializes both FULL match sets
    (guarded: raises if N exceeds the fetch depth) because tie > 0 makes
    truncated top-k lists unsound in general; the 10^12-doc path is a
    WAND-style traversal with the combined bound
    max(w_h*ub_h, w_b*ub_b) + tie*min(...), which the per-subquery
    block-max machinery already supplies.  With tie = 0 the global top-k
    provably lives inside the union of the per-subquery top-k lists and
    no full fetch is needed.
    """
    searcher = BM25Searcher(documents_head_index(sf_dir))
    depth = 100_000
    if int(searcher.stats["N"]) > depth:
        raise ValueError("dismax full-fetch guard: corpus exceeds depth")
    qs = [(" ".join(terms), depth) for _, terms, _ in DOC_QUERIES]
    body = searcher.search_many(qs)
    head = searcher.search_many(qs, field="head")
    tables = []
    for (qid, _, k), rb, rh in zip(DOC_QUERIES, body, head):
        sb = dict(
            zip(rb["docID"].to_pylist(), rb["score"].to_pylist())
        )
        sh = dict(
            zip(rh["docID"].to_pylist(), rh["score"].to_pylist())
        )
        docs = np.array(sorted(set(sb) | set(sh)), dtype=np.int64)
        a = np.array([DISMAX_W_HEAD * sh.get(int(d), 0.0) for d in docs])
        b = np.array([DISMAX_W_BODY * sb.get(int(d), 0.0) for d in docs])
        score = np.maximum(a, b) + DISMAX_TIE * np.minimum(a, b)
        order = np.lexsort((docs, -score))[:k]
        tables.append(
            pa.table(
                {
                    "qid": pa.array(np.full(len(order), qid, dtype=np.int64)),
                    "rank": pa.array(
                        np.arange(1, len(order) + 1, dtype=np.int64)
                    ),
                    "doc_id": pa.array(docs[order], pa.int64()),
                }
            )
        )
    return pa.concat_tables(tables)


def dismax_sql_oracle(
    w_head: float = DISMAX_W_HEAD,
    w_body: float = DISMAX_W_BODY,
    tie: float = DISMAX_TIE,
) -> str:
    """max(w_h*S_head, w_b*S_body) + tie*min(...) where S_body is plain
    BM25 and S_head is the head-namespace score (head tf + head df, full
    dl normalization — the engine's marker-namespace semantics, identical
    to bm25_head_boost_sql_oracle's scored_h)."""
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms, _ in DOC_QUERIES for t in terms
    )
    return f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT doc_id, unnest(toks) AS term FROM arr),
th AS (SELECT doc_id, unnest(toks[1:8]) AS term FROM arr),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
tfh AS (SELECT doc_id, term, count(*) AS tf FROM th GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
dfh AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfh GROUP BY term),
q(qid, term) AS (VALUES {values}),
scored_b AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
scored_h AS (
  SELECT q.qid, tfh.doc_id,
         sum(
           ln((stats.n - dfh.df + 0.5) / (dfh.df + 0.5) + 1.0)
           * (tfh.tf * 2.2)
           / (tfh.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tfh USING (term)
  JOIN dfh USING (term)
  JOIN dl ON tfh.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tfh.doc_id
),
combined AS (
  SELECT b.qid, b.doc_id,
         greatest({w_head!r} * coalesce(h.score, 0.0),
                  {w_body!r} * b.score)
         + {tie!r} * least({w_head!r} * coalesce(h.score, 0.0),
                           {w_body!r} * b.score) AS score
  FROM scored_b b
  LEFT JOIN scored_h h ON b.qid = h.qid AND b.doc_id = h.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM combined
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""


# (qid, query with one-star wildcards, k)
WILDCARD_QUERIES: list[tuple[int, str, int]] = [
    (1, "*ow scan", 10),       # suffix: row, slow, ...
    (2, "f*t table", 10),      # infix: fast, ...
    (3, "*le query", 10),      # suffix: table, ...
    (4, "s* window", 10),      # prefix via the same surface
    (5, "*zzz merge", 10),     # no-match wildcard contributes nothing
]


def wildcard_search(sf_dir: str) -> pa.Table:
    """General wildcard BM25: ``p*`` / ``*s`` / ``a*b`` tokens expand via
    the lexicon (prefix = sorted range probe; suffix/infix = vectorized
    ends_with sweep — the reversed-term-lexicon sidecar is the 10^12
    scale path, see ``Lexicon.wildcard_terms``) into an OR over every
    matching term with its own idf.  Completes the term-expansion family
    (prefix ``bm25_prefix_topk``, fuzzy ``bm25_fuzzy_topk``, regex
    ``trigram_regex``).  (qid, rank, doc_id); the oracle expands the same
    patterns with SQL LIKE over the distinct vocabulary."""
    out = documents_index(sf_dir)
    searcher = BM25Searcher(out)
    results = searcher.search_wildcard_many(
        [(q, k) for _, q, k in WILDCARD_QUERIES]
    )
    tables = []
    for (qid, _, _), r in zip(WILDCARD_QUERIES, results):
        tables.append(
            r.add_column(0, "qid", pa.array(np.full(len(r), qid, dtype=np.int64)))
        )
    t = pa.concat_tables(tables)
    return t.rename_columns(["qid", "rank", "doc_id", "score"]).select(
        ["qid", "rank", "doc_id"]
    )


def wildcard_sql_oracle() -> str:
    pats = []
    for qid, q, _ in WILDCARD_QUERIES:
        for tok in q.split():
            if "*" in tok:
                pre, suf = tok.lower().split("*")
                pats.append(
                    f"({qid}, '{pre}%{suf}', {len(pre) + len(suf)})"
                )
            else:
                pats.append(f"({qid}, '{tok.lower()}', {len(tok)})")
    values = ", ".join(pats)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM t) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
qp(qid, pat, minlen) AS (VALUES {values}),
q AS (
  SELECT DISTINCT qp.qid, df.term
  FROM qp JOIN df ON df.term LIKE qp.pat AND length(df.term) >= qp.minlen
),
scored AS (
  SELECT q.qid, tf.doc_id,
         sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT qid, rank, doc_id FROM ranked WHERE rank <= 10
"""
