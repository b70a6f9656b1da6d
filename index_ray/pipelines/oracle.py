"""Brute-force BM25 oracle — the independent scorer the engine must match.

Shares only the frozen tokenizer (SURVEY.md §7.4) with the engine; no
varint/pack/shuffle/actor code is touched.  tf/df come from plain python
dicts over an in-memory pass of the corpus; scoring mirrors the exact
np.float64 operation order the engine uses (ascending term, ascending
docID), so top-k docIDs AND scores must match bit-for-bit (SURVEY.md
§2.11, §5.2.2).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions.tokenize import TokenNormalizer, doc_term_tf
from .query import B, K1, query_terms


class BruteForceBM25:
    def __init__(self, docids, texts, tokenizer_mode: str = "code"):
        """docids: int64 array-like; texts: list/array of strings."""
        norm = TokenNormalizer(tokenizer_mode)
        self.mode = tokenizer_mode
        docids = np.asarray(docids, dtype=np.int64)
        d, tid, tf, vocab = doc_term_tf(pa.array(list(texts)), norm)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        order = np.lexsort((d, tid))  # group by term, docID asc (docids asc in d order? see below)
        # map batch row -> docid; rows may be in any docid order, so re-sort
        # each term's postings by actual docID
        doc_of = docids[d]
        for t in range(len(vocab)):
            sel = tid == t
            dd = doc_of[sel]
            ff = tf[sel]
            o = np.argsort(dd, kind="stable")
            self.postings[vocab[t]] = (dd[o], ff[o].astype(np.float64))
        self.doclen = dict(
            zip(docids.tolist(), np.bincount(d, tf, minlength=len(docids)).tolist())
        )
        self.N = len(docids)
        self.total_tokens = int(tf.sum())
        self.avgdl = self.total_tokens / self.N if self.N else 0.0
        self.docids = docids
        self._dl = np.zeros(int(docids.max()) + 1 if len(docids) else 1)
        self._dl[docids] = [self.doclen[int(i)] for i in docids]

    def idf(self, term: str) -> float:
        df = len(self.postings[term][0]) if term in self.postings else 0
        return math.log((self.N - df + 0.5) / (df + 0.5) + 1.0)

    def search_lm(self, query: str, k: int = 10, mu: float = 2000.0) -> pa.Table:
        """Query-likelihood Dirichlet LM scoring — mirrors the exact
        float64 op order of ``_score_chunk_lm`` (ascending term order,
        ``(mu*cf)/C`` then divide, ``ln(1.0+x)``, dl term added last), so
        engine scores must match bit-for-bit."""
        terms = query_terms(query, self.mode)
        maxdoc = int(self.docids.max()) + 1 if len(self.docids) else 1
        scores = np.zeros(maxdoc, dtype=np.float64)
        m = np.zeros(maxdoc, dtype=np.int64)
        total = float(self.total_tokens)
        for term in terms:  # ascending term order == engine order
            if term not in self.postings:
                continue
            docs, tfs = self.postings[term]
            denom = (mu * float(tfs.sum())) / total
            scores[docs] += np.log(1.0 + tfs / denom)
            m[docs] += 1
        nz = np.flatnonzero(m)
        scores[nz] += m[nz] * np.log(mu / (self._dl[nz] + mu))
        order = np.lexsort((nz, -scores[nz]))[:k]
        top = nz[order]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
                "docID": pa.array(top.astype(np.int64)),
                "score": pa.array(scores[top], type=pa.float64()),
            }
        )

    def search(self, query: str, k: int = 10) -> pa.Table:
        terms = query_terms(query, self.mode)
        maxdoc = int(self.docids.max()) + 1 if len(self.docids) else 1
        scores = np.zeros(maxdoc, dtype=np.float64)
        for term in terms:  # ascending term order == engine order
            if term not in self.postings:
                continue
            docs, tfs = self.postings[term]
            idf = self.idf(term)
            dl = self._dl[docs]
            contrib = idf * (tfs * (K1 + 1.0)) / (tfs + K1 * (1.0 - B + B * dl / self.avgdl))
            scores[docs] += contrib
        nz = np.flatnonzero(scores)
        order = np.lexsort((nz, -scores[nz]))[:k]
        top = nz[order]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
                "docID": pa.array(top.astype(np.int64)),
                "score": pa.array(scores[top], type=pa.float64()),
            }
        )
