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

from ..functions.tokenize import TokenNormalizer, doc_term_tf

_GOLDEN64 = 0x9E3779B1  # fits int64: salt * prime stays in integer arithmetic


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
        head_tokens: int = 0,
        style_head: int = 0,
        term_vectors: bool = False,
        style_levels: tuple | None = None,
    ):
        self.norm = TokenNormalizer(mode)
        self.text_col = text_col
        self.docid_col = docid_col
        self.num_parts = num_parts
        self.salt_docs = salt_docs
        self.positions = positions
        self.field_col = field_col
        self.head_tokens = head_tokens
        # style_head: per-posting style folded into the wire tf slot — the
        # reference's per-posting style/weight bits
        # (/root/reference/index.h:44-49) without the marker-namespace
        # posting duplication head_tokens costs.
        #   int H > 0        -> 1-bit head flag (first occurrence < H), wire
        #                       (tf << 1) | style
        #   (h1, h2, h3)     -> 2-bit 4-class enum by first-occurrence depth
        #                       (p < h1 -> 3, < h2 -> 2, < h3 -> 1, else 0 —
        #                       the reference's Normal/Heading/Italic/Bold
        #                       widths), wire (tf << 2) | class
        self.style_levels: np.ndarray | None = None
        if style_levels is not None:
            if style_head:
                raise ValueError("style_head and style_levels are exclusive")
            lv = [int(x) for x in style_levels]
            if len(lv) != 3 or any(
                a >= b for a, b in zip(lv, lv[1:])
            ) or lv[0] <= 0:
                raise ValueError(
                    "style levels must be 3 ascending positive ints"
                )
            self.style_levels = np.asarray(lv, dtype=np.int64)
            self.style_head = lv[-1]  # truthy: style path active
            self.style_bits = 2
        else:
            self.style_head = style_head
            self.style_bits = 1 if style_head else 0
        self.hot: frozenset = (
            ray.get(hot_ref) if hot_ref is not None else frozenset()
        )
        self._part_cache: dict[str, tuple[int, bool]] = {}
        self.docmap_dir = docmap_dir
        self._dm_buf: list[pa.Table] = []
        # term_vectors: also persist the FORWARD index (docID, term, tf) as
        # a tvec/ sidecar next to docmap/ — Lucene's stored term vectors:
        # doc -> terms is unanswerable from the inverted shards without a
        # full lexicon scan, so it must be captured at tokenize time.
        self.term_vectors = term_vectors
        self._tv_buf: list[pa.Table] = []
        if docmap_dir:
            import os

            os.makedirs(docmap_dir, exist_ok=True)

    def _vocab_info(self, vocab: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(crc32 partition hash, is-hot) per vocab entry — ONE memoized
        pass over the batch's distinct terms (term-level work is the only
        remaining Python loop in the tokenize hot path)."""
        crc = np.empty(len(vocab), dtype=np.int64)
        vhot = np.empty(len(vocab), dtype=bool)
        info = self._part_cache
        iget = info.get
        hot = self.hot
        _crc32 = zlib.crc32
        for i, v in enumerate(vocab):
            e = iget(v)
            if e is None:
                e = (_crc32(v.encode()), v in hot)
                if len(info) > 4_000_000:
                    info.clear()
                info[v] = e
            crc[i] = e[0]
            vhot[i] = e[1]
        return crc, vhot

    def _with_marker_terms(
        self,
        batch: pa.Table,
        d: np.ndarray,
        tid: np.ndarray,
        vocab: list[str],
        pos: np.ndarray | None,
    ) -> tuple[np.ndarray, np.ndarray, list[str], np.ndarray | None]:
        """Duplicate occurrences under marker-prefixed dictionary keys — the
        reference's prefixed namespaces (``/root/reference/index.h:320-326``)
        generalized two ways, both computed from the ORIGINAL content
        occurrences (markers never re-mark each other):

        - ``field_col``: every occurrence also under ``{field}:{term}``
          (field value from a metadata column).
        - ``head_tokens``: occurrences whose within-doc ordinal is < H also
          under ``head:{term}`` — the reference's title/head style routing
          (style bits, ``/root/reference/index.h:44-49``): the query side
          can weight the head namespace as a score boost.

        ``pos`` (positions aligned with d/tid) is duplicated alongside so
        marker postings stay position-addressable."""
        vocab2 = list(vocab)
        add_d, add_tid, add_pos = [], [], []
        if self.head_tokens:
            occpos = np.arange(len(d)) - np.searchsorted(d, d)
            hm = occpos < self.head_tokens
            huniq, hinv = np.unique(tid[hm], return_inverse=True)
            off = len(vocab2)
            vocab2 += [f"head:{vocab[int(c)]}" for c in huniq]
            add_d.append(d[hm])
            add_tid.append(hinv + off)
            if pos is not None:
                add_pos.append(pos[hm])
        if self.field_col:
            fvals = batch[self.field_col].to_pylist()
            funiq = sorted(set(fvals))
            fmap = {f: i for i, f in enumerate(funiq)}
            fdoc = np.array([fmap[f] for f in fvals], dtype=np.int64)
            V = max(len(vocab), 1)
            combo = fdoc[d] * V + tid
            uniq, inv = np.unique(combo, return_inverse=True)
            off = len(vocab2)
            vocab2 += [f"{funiq[int(c) // V]}:{vocab[int(c) % V]}" for c in uniq]
            add_d.append(d)
            add_tid.append(inv + off)
            if pos is not None:
                add_pos.append(pos)
        d2 = np.concatenate([d] + add_d)
        tid2 = np.concatenate([tid] + add_tid)
        pos2 = np.concatenate([pos] + add_pos) if pos is not None else None
        return d2, tid2, vocab2, pos2

    def _buffer_docmap(self, batch: pa.Table, n_tok: np.ndarray) -> None:
        """docmap rows from the SAME tokenization (n_tokens = sum tf) —
        sha256 invariant + identity columns, no second tokenize pass.
        Hashes run over zero-copy views of the Arrow string buffer (utf-8
        already) instead of decode/encode round-trips per document."""
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.offset == 0 and col.null_count == 0:
            offs = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1)
            data = memoryview(col.buffers()[2])
            sha_vals = [
                hashlib.sha256(data[offs[i] : offs[i + 1]]).hexdigest()
                for i in range(len(col))
            ]
        else:
            sha_vals = [
                hashlib.sha256(s.encode("utf-8")).hexdigest() if s is not None else None
                for s in col.to_pylist()
            ]
        sha = pa.array(sha_vals, type=pa.string())
        out = batch.drop_columns([self.text_col])
        out = out.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))
        self._dm_buf.append(out.append_column("content_sha256", sha))

    def flush_sidecar(self, spec: dict) -> None:
        """Write this row group's docmap parquet + stats JSON (deterministic
        names -> idempotent under task retry); called by ReadApply per row
        group.  The stats sidecar carries the chunk-level counters so the
        driver never rescans docmap data (the manifest aggregation is a sum
        of tiny JSONs, not a parquet pass)."""
        if not self.docmap_dir:
            return
        import json
        import os

        import pyarrow.parquet as pq

        if self.term_vectors:
            tv = pa.concat_tables(self._tv_buf) if self._tv_buf else None
            self._tv_buf = []
            if tv is not None and len(tv):
                tv_dir = os.path.join(os.path.dirname(self.docmap_dir), "tvec")
                os.makedirs(tv_dir, exist_ok=True)
                tpath = os.path.join(
                    tv_dir, f"rg-{spec['base_docid']:012d}.parquet"
                )
                ttmp = tpath + f".{os.getpid()}.tmp"
                pq.write_table(tv, ttmp)
                os.replace(ttmp, tpath)
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
        ids = t[self.docid_col].to_numpy(zero_copy_only=False)
        stats = {
            "docs": len(t),
            "tokens": int(pa.compute.sum(t["n_tokens"]).as_py() or 0),
            "doc_min": int(ids.min()),
            "doc_max": int(ids.max()),
        }
        spath = os.path.join(
            self.docmap_dir, f"rg-{spec['base_docid']:012d}.stats.json"
        )
        stmp = spath + f".{os.getpid()}.tmp"
        with open(stmp, "w") as fh:
            json.dump(stats, fh)
        os.replace(stmp, spath)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.tokenize import tokenize_batch as _tb
        from .pack import BLOB_SCHEMA, encode_batch_blobs

        # one occurrence-level pass + ONE lexsort; (term, doc, tf) postings
        # fall out as run lengths (no separate np.unique aggregation sort)
        docc, tidocc, vocab = _tb(batch[self.text_col], self.norm)
        n_orig_vocab = len(vocab)
        if self.docmap_dir:
            n_tok = np.bincount(docc, minlength=len(batch)).astype(np.int64)
            self._buffer_docmap(batch, n_tok)
        if len(docc) == 0:
            return BLOB_SCHEMA.empty_table()
        posocc = (
            np.arange(len(docc)) - np.searchsorted(docc, docc)
            if self.positions or self.style_head
            else None
        )
        if self.field_col or self.head_tokens:
            docc, tidocc, vocab, posocc = self._with_marker_terms(
                batch, docc, tidocc, vocab, posocc
            )
        docids_occ = batch[self.docid_col].to_numpy(zero_copy_only=False)[docc]
        keys = (
            (posocc, docids_occ, tidocc) if posocc is not None else (docids_occ, tidocc)
        )
        order = np.lexsort(keys)
        t_o, doc_o = tidocc[order], docids_occ[order]
        pos_o = posocc[order] if posocc is not None else None
        npost = np.empty(len(t_o), dtype=bool)
        npost[0] = True
        np.logical_or(t_o[1:] != t_o[:-1], doc_o[1:] != doc_o[:-1], out=npost[1:])
        pstarts = np.flatnonzero(npost)
        tfs = np.diff(np.append(pstarts, len(t_o))).astype(np.int64)
        tcode = t_o[pstarts]
        doc = doc_o[pstarts]
        if self.term_vectors and self.docmap_dir:
            # content-namespace postings only (marker terms sit past the
            # original vocab boundary); (doc, term, tf) falls out of the
            # same run-length pass — no second tokenize
            tvm = tcode < n_orig_vocab
            self._tv_buf.append(
                pa.table(
                    {
                        "docID": pa.array(doc[tvm], pa.int64()),
                        "term": pa.array(
                            vocab[: n_orig_vocab], type=pa.string()
                        ).take(pa.array(tcode[tvm])),
                        "tf": pa.array(tfs[tvm], pa.int64()),
                    }
                )
            )
        vhash, vhot = self._vocab_info(vocab)
        if self.hot:
            salt = np.where(vhot[tcode], doc // self.salt_docs, 0).astype(np.int64)
        else:
            salt = np.zeros(len(doc), dtype=np.int64)
        style = None
        if self.style_head:
            # occurrences within a posting keep document order (the lexsort
            # chain is stable), so pos_o[pstarts] is each posting's FIRST
            # occurrence ordinal — styled by how early it falls
            first = pos_o[pstarts]
            if self.style_levels is not None:
                # class 3..0 by depth: searchsorted right gives 0 for
                # p < h1 (deepest prominence), 3 for p >= h3
                style = (
                    3 - np.searchsorted(self.style_levels, first, side="right")
                ).astype(np.uint64)
            else:
                style = (first < self.style_head).astype(np.uint64)
        starts, ends, blob_arr = encode_batch_blobs(
            tcode, doc, tfs, salt,
            pos=pos_o if self.positions else None,
            style=style,
            style_bits=self.style_bits or 1,
        )
        gcodes = tcode[starts]
        gsalt = salt[starts]
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
