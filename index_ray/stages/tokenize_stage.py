"""Tokenize/count stages — callable classes for map_batches actor pools.

Equivalent of the reference's ``Index::addDocument`` token routing
(``/root/reference/index.cpp:112-162``) re-expressed as stateless-in/
stateless-out Arrow batch transforms; the per-worker state (normalizer
memo cache, broadcast hot-term set) is loaded once in ``__init__`` per
actor, not per batch.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import ray

from ..functions.tokenize import TokenNormalizer, doc_term_tf, doc_token_counts

_GOLDEN64 = 0x9E3779B1  # fits int64: salt * prime stays in integer arithmetic


class TokenizeCount:
    """content batch -> (term, salt, part, docID, tf) posting runs.

    ``salt`` is nonzero only for broadcast-identified hot terms:
    ``salt = docID // salt_docs`` — a docID *range* split, so salted blocks
    concatenate back into one docID-sorted posting list in salt order
    (SURVEY.md §7.3/§7.4 hot-term salting).

    ``part = H(term, salt) % num_parts`` is the shuffle key: the pack stage
    groups by ``part`` so one vectorized call packs a whole hash partition.
    """

    def __init__(
        self,
        mode: str,
        text_col: str,
        docid_col: str,
        num_parts: int,
        salt_docs: int,
        hot_ref=None,
    ):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col
        self.docid_col = docid_col
        self.num_parts = num_parts
        self.salt_docs = salt_docs
        self.hot: frozenset = (
            ray.get(hot_ref) if hot_ref is not None else frozenset()
        )
        self._part_cache: dict[str, int] = {}

    def _term_hash(self, term: str) -> int:
        h = self._part_cache.get(term)
        if h is None:
            h = zlib.crc32(term.encode())
            if len(self._part_cache) > 4_000_000:
                self._part_cache.clear()
            self._part_cache[term] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
        docids = batch[self.docid_col].to_numpy(zero_copy_only=False)[d]
        vhash = np.fromiter(
            (self._term_hash(v) for v in vocab), dtype=np.int64, count=len(vocab)
        )
        vhot = (
            np.fromiter((v in self.hot for v in vocab), dtype=bool, count=len(vocab))
            if self.hot
            else np.zeros(len(vocab), dtype=bool)
        )
        salt = np.where(vhot[tid], docids // self.salt_docs, 0).astype(np.int64)
        part = ((vhash[tid] + salt * _GOLDEN64) % self.num_parts).astype(np.int32)
        terms = pa.array(vocab, type=pa.string()).take(pa.array(tid))
        return pa.Table.from_arrays(
            [
                terms,
                pa.array(salt, type=pa.int64()),
                pa.array(part, type=pa.int32()),
                pa.array(docids, type=pa.int64()),
                pa.array(tf, type=pa.int64()),
            ],
            names=["term", "salt", "part", "docID", "tf"],
        )


class TokenizeBlob:
    """content batch -> per-(term, salt) varint blob rows (map-side combine).

    Emits ``BLOB_SCHEMA`` rows: one row per distinct (term, salt) per batch
    with the batch's postings delta+varint-packed into ``blob``.  The
    groupby-part shuffle then moves ~3 bytes per posting instead of a
    full (term, docID, tf) row — the pre-aggregation the north rule's
    "per-partition posting runs -> shuffle-merge" describes.
    """

    def __init__(
        self,
        mode: str,
        text_col: str,
        docid_col: str,
        num_parts: int,
        salt_docs: int,
        hot_ref=None,
        docmap_dir: str | None = None,
        positions: bool = False,
        field_col: str | None = None,
    ):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col
        self.docid_col = docid_col
        self.num_parts = num_parts
        self.salt_docs = salt_docs
        self.positions = positions
        self.field_col = field_col
        self.hot: frozenset = (
            ray.get(hot_ref) if hot_ref is not None else frozenset()
        )
        self._part_cache: dict[str, int] = {}
        self.docmap_dir = docmap_dir
        self._dm_buf: list[pa.Table] = []
        if docmap_dir:
            import os

            os.makedirs(docmap_dir, exist_ok=True)

    def _term_hash(self, term: str) -> int:
        h = self._part_cache.get(term)
        if h is None:
            h = zlib.crc32(term.encode())
            if len(self._part_cache) > 4_000_000:
                self._part_cache.clear()
            self._part_cache[term] = h
        return h

    def _with_field_terms(
        self,
        batch: pa.Table,
        d: np.ndarray,
        tid: np.ndarray,
        vocab: list[str],
        extras: tuple[np.ndarray, ...],
    ) -> tuple[np.ndarray, np.ndarray, list[str], tuple[np.ndarray, ...]]:
        """Duplicate every occurrence under a field-prefixed key
        ``{field}:{term}`` — the reference's marker-prefixed dictionary
        namespaces (``/root/reference/index.h:320-326``) generalized to a
        metadata column.  ``extras`` (tf or positions arrays aligned with
        d/tid) are duplicated alongside."""
        fvals = batch[self.field_col].to_pylist()
        funiq = sorted(set(fvals))
        fmap = {f: i for i, f in enumerate(funiq)}
        fdoc = np.array([fmap[f] for f in fvals], dtype=np.int64)
        V = max(len(vocab), 1)
        combo = fdoc[d] * V + tid
        uniq, inv = np.unique(combo, return_inverse=True)
        ext_vocab = list(vocab) + [
            f"{funiq[int(c) // V]}:{vocab[int(c) % V]}" for c in uniq
        ]
        tid2 = np.concatenate([tid, inv + len(vocab)])
        d2 = np.concatenate([d, d])
        extras2 = tuple(np.concatenate([e, e]) for e in extras)
        return d2, tid2, ext_vocab, extras2

    def _buffer_docmap(self, batch: pa.Table, n_tok: np.ndarray) -> None:
        """docmap rows from the SAME tokenization (n_tokens = sum tf) —
        sha256 invariant + identity columns, no second tokenize pass."""
        sha = pa.array(
            [
                hashlib.sha256(s.encode("utf-8")).hexdigest() if s is not None else None
                for s in batch[self.text_col].to_pylist()
            ],
            type=pa.string(),
        )
        out = batch.drop_columns([self.text_col])
        out = out.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))
        self._dm_buf.append(out.append_column("content_sha256", sha))

    def flush_sidecar(self, spec: dict) -> None:
        """Write this row group's docmap parquet (deterministic name ->
        idempotent under task retry); called by ReadApply per row group."""
        if not self.docmap_dir:
            return
        import os

        import pyarrow.parquet as pq

        t = pa.concat_tables(self._dm_buf) if self._dm_buf else None
        self._dm_buf = []
        if t is None or len(t) == 0:
            return
        path = os.path.join(
            self.docmap_dir, f"rg-{spec['base_docid']:012d}.parquet"
        )
        tmp = path + f".{os.getpid()}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .pack import BLOB_SCHEMA, encode_batch_blobs

        pos_o = None
        if self.positions:
            # occurrence-level pass: per-token within-doc positions ride
            # along in the blob (third slot section)
            from ..functions.tokenize import tokenize_batch as _tb

            docc, tidocc, vocab = _tb(batch[self.text_col], self.norm)
            if self.docmap_dir:
                n_tok = np.bincount(docc, minlength=len(batch)).astype(np.int64)
                self._buffer_docmap(batch, n_tok)
            if len(docc) == 0:
                return BLOB_SCHEMA.empty_table()
            posocc = np.arange(len(docc)) - np.searchsorted(docc, docc)
            if self.field_col:
                docc, tidocc, vocab, (posocc,) = self._with_field_terms(
                    batch, docc, tidocc, vocab, (posocc,)
                )
            docids_occ = batch[self.docid_col].to_numpy(zero_copy_only=False)[docc]
            order = np.lexsort((posocc, docids_occ, tidocc))
            t_o, doc_o, pos_o = tidocc[order], docids_occ[order], posocc[order]
            npost = np.empty(len(t_o), dtype=bool)
            npost[0] = True
            np.logical_or(t_o[1:] != t_o[:-1], doc_o[1:] != doc_o[:-1], out=npost[1:])
            pstarts = np.flatnonzero(npost)
            tfs = np.diff(np.append(pstarts, len(t_o))).astype(np.int64)
            tcode = t_o[pstarts]
            doc = doc_o[pstarts]
        else:
            d, tid, tf, vocab = doc_term_tf(batch[self.text_col], self.norm)
            if self.docmap_dir:
                n_tok = np.bincount(d, weights=tf, minlength=len(batch)).astype(np.int64)
                self._buffer_docmap(batch, n_tok)
            if len(d) == 0:
                return BLOB_SCHEMA.empty_table()
            if self.field_col:
                d, tid, vocab, (tf,) = self._with_field_terms(
                    batch, d, tid, vocab, (tf,)
                )
            docids = batch[self.docid_col].to_numpy(zero_copy_only=False)[d]
            order = np.lexsort((docids, tid))
            tcode = tid[order]
            doc = docids[order]
            tfs = tf[order]
        if self.hot:
            vhot = np.fromiter(
                (v in self.hot for v in vocab), dtype=bool, count=len(vocab)
            )
            salt = np.where(vhot[tcode], doc // self.salt_docs, 0).astype(np.int64)
        else:
            salt = np.zeros(len(doc), dtype=np.int64)
        starts, ends, blob_arr = encode_batch_blobs(tcode, doc, tfs, salt, pos=pos_o)
        gcodes = tcode[starts]
        gsalt = salt[starts]
        vhash = np.fromiter(
            (self._term_hash(v) for v in vocab), dtype=np.int64, count=len(vocab)
        )
        part = ((vhash[gcodes] + gsalt * _GOLDEN64) % self.num_parts).astype(np.int32)
        terms = pa.array(vocab, type=pa.string()).take(pa.array(gcodes))
        df = (ends - starts).astype(np.int64)
        cf = np.add.reduceat(tfs, starts).astype(np.int64)
        return pa.Table.from_arrays(
            [
                terms,
                pa.array(gsalt.astype(np.int32), type=pa.int32()),
                pa.array(part, type=pa.int32()),
                pa.array(doc[starts], type=pa.int64()),
                pa.array(df.astype(np.int32), type=pa.int32()),
                pa.array(cf.astype(np.int32), type=pa.int32()),
                blob_arr,
            ],
            schema=BLOB_SCHEMA,
        )


class PartialTermCounts:
    """content batch -> (term, df_part) partial counts for the hot census.

    Pre-aggregation inside map_batches (one row per distinct term per
    batch) so the census groupby shuffles vocabulary-sized partials, not
    posting-sized runs.
    """

    def __init__(self, mode: str, text_col: str):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, tid, _, vocab = doc_term_tf(batch[self.text_col], self.norm)
        if len(vocab) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df_part": pa.array([], pa.int64())}
            )
        counts = np.bincount(tid, minlength=len(vocab)).astype(np.int64)
        return pa.table({"term": pa.array(vocab), "df_part": pa.array(counts)})


class DocMetaWriter:
    """Per-row-group docmap sink for the fused build pass (ReadApply sink).

    Writes one docmap parquet per row group, named by the row group's
    base docID — deterministic, so task retries overwrite atomically.
    """

    def __init__(self, docmap_dir: str, mode: str, text_col: str):
        import os

        os.makedirs(docmap_dir, exist_ok=True)
        self.dir = docmap_dir
        self.inner = DocMeta(mode, text_col)

    def __call__(self, tbl: pa.Table, spec: dict) -> None:
        import os

        import pyarrow.parquet as pq

        out = self.inner(tbl)
        path = os.path.join(self.dir, f"rg-{spec['base_docid']:012d}.parquet")
        tmp = path + f".{os.getpid()}.tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)


class DocMeta:
    """content batch -> docmap rows (docID, passthrough cols, n_tokens, sha256).

    ``n_tokens`` is the post-normalization token count (== the sum of this
    doc's tf over all terms — the Σdoclen == Σtf invariant, SURVEY.md
    §5.2.3); ``content_sha256`` is the per-row invariant pinned by
    BASELINE.json ``input_hint``.
    """

    def __init__(self, mode: str, text_col: str):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        n_tok = doc_token_counts(texts, self.norm)
        sha = pa.array(
            [
                hashlib.sha256(s.encode("utf-8")).hexdigest() if s is not None else None
                for s in texts.to_pylist()
            ],
            type=pa.string(),
        )
        out = batch.drop_columns([self.text_col])
        out = out.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))
        return out.append_column("content_sha256", sha)
