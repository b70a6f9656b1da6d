"""BM25 query engine over stateful shard-searcher actors.

The reference's read path is one mmap'd chunk blob per reader with
``Find(key)`` hash probes (``/root/reference/index.cpp:22-46``,
``index.cpp:9-14``); a multi-chunk query engine and scorer are absent from
the snapshot, so the BM25 contract is pinned by SURVEY.md §2.11:

    score(q,d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*|d|/avgdl))
    idf(t)     = ln((N - df + 0.5)/(df + 0.5) + 1)      (always >= 0)
    k1 = 1.2, b = 0.75; unique query terms; ties broken by ascending docID.

Architecture: one ``SearchShard`` actor per group of build chunks
(document-partitioned, so each shard scores its docID range completely and
returns a local top-k; the driver merge is a pure k-way select, never a
re-sum).  Term -> postings dict, doclen arrays and skip metadata load once
in the actor constructor (the reference's T3 mmap residency,
SURVEY.md §2.3).  Global idf comes from the merged lexicon via a
term-filtered parquet read on the driver — the broadcast-small-side "join"
(SURVEY.md §2.4 J1).

Determinism: terms are processed in ascending term order and postings in
ascending docID order, with np.float64 accumulation — bit-identical to the
brute-force oracle (``oracle.py``), which mirrors the same operation order.

Block-max pruning (``prune=True``): per 128-posting sub-block, an upper
bound ``idf * (k1+1)*max_tf/(max_tf + k1*(1-b))`` (a monotone-in-tf bound
that assumes the shortest possible doc) plus the current partial-score
range-max decides whether the sub-block can affect the final top-k; pruned
sub-blocks are never decoded (their byte ranges are skipped via the
gap-reset skip offsets).  Pruning is score-lossless for the returned top-k
— enforced by tests comparing against ``prune=False`` and the oracle.
"""

from __future__ import annotations

import glob
import math
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray

from ..functions.tokenize import TokenNormalizer, tokenize_batch
from ..stages.pack import (
    SKIP_INTERVAL,
    unpack_block,
    unpack_positions,
    unpack_subblocks,
)
from .build import load_stats

K1 = 1.2
B = 0.75


def query_terms(query: str, tokenizer_mode: str) -> list[str]:
    """Unique, ascending-sorted query terms under the index's tokenizer."""
    norm = TokenNormalizer(tokenizer_mode)
    _, tid, vocab = tokenize_batch(pa.array([query]), norm)
    return sorted(set(vocab[t] for t in tid))


def query_terms_ordered(query: str, tokenizer_mode: str) -> list[str]:
    """Query terms in occurrence order (duplicates kept) — phrase queries."""
    norm = TokenNormalizer(tokenizer_mode)
    _, tid, vocab = tokenize_batch(pa.array([query]), norm)
    return [vocab[t] for t in tid]


_DSL_TOKEN = re.compile(r'"([^"]*)"|(\S+)')


def parse_dsl(q: str) -> dict:
    """Parse the mini query DSL into clause lists (raw, un-analyzed):

    - ``"a b"``   exact phrase (FILTER clause — phrase words score only
                  if they also appear as bare terms)
    - ``+term``   required (document must contain it)
    - ``-term``   excluded (boolean NOT)
    - ``ns:term`` field-scoped term (requires a field-marker index)
    - ``term*``   prefix expansion, ``term~`` fuzzy expansion
    - ``term``    optional scored term

    Returns {opt, req, exc, prefix, fuzzy, phrases, fields}."""
    out: dict[str, list] = {
        "opt": [], "req": [], "exc": [], "prefix": [], "fuzzy": [],
        "phrases": [], "fields": [],
    }
    for m in _DSL_TOKEN.finditer(q):
        if m.group(1) is not None:
            if m.group(1).strip():
                out["phrases"].append(m.group(1))
            continue
        tok = m.group(2)
        sign = ""
        if tok[0] in "+-":
            sign, tok = tok[0], tok[1:]
        if not tok:
            continue
        if ":" in tok[1:]:
            ns, t = tok.split(":", 1)
            out["fields"].append((ns, t))
        elif tok.endswith("*") and len(tok) > 1:
            out["prefix"].append(tok[:-1])
        elif tok.endswith("~") and len(tok) > 1:
            out["fuzzy"].append(tok[:-1])
        elif sign == "+":
            out["req"].append(tok)
        elif sign == "-":
            out["exc"].append(tok)
        else:
            out["opt"].append(tok)
    return out


def _deletions1(t: str) -> list[str]:
    """The string itself plus every single-character deletion."""
    return [t] + [t[:i] + t[i + 1 :] for i in range(len(t))]


def _within_lev1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance-<=-1 check (no DP needed at this radius:
    equal lengths allow one substitution; a length gap of one allows one
    insertion, checked by splicing at the first mismatch)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


class Lexicon:
    """Driver-resident term -> df lookup over the merged lexicon.

    Loads the whole (term, df) mapping once when it fits in
    ``max_resident_bytes`` (the reference's T3 residency for the dict);
    falls back to term-filtered parquet reads for huge vocabularies —
    either way the parquet is opened once, not per search call.
    """

    def __init__(
        self,
        index_dir: str,
        n_docs: int,
        max_resident_bytes: int = 256 << 20,
        lex_dir: str | None = None,
    ):
        self.n = n_docs
        # the reversed sidecar belongs to the LIVE lexicon only: a
        # snapshot reader (lex_dir override) must not probe the current
        # index's rev table — it would expand against the wrong vocabulary
        self._rev_dir = (
            os.path.join(index_dir, "lexicon_rev") if lex_dir is None else ""
        )
        files = sorted(
            glob.glob(os.path.join(lex_dir or os.path.join(index_dir, "lexicon"), "*.parquet"))
        )
        size = sum(os.path.getsize(f) for f in files)
        self._files = files
        self._map: dict[str, int] | None = None
        self._ds = None
        if size <= max_resident_bytes:
            t = pa.concat_tables(pq.read_table(f, columns=["term", "df"]) for f in files)
            self._map = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        else:
            self._ds = pads.dataset(files)

    def prefix_terms(self, prefix: str, limit: int | None = None) -> list[str]:
        """Every lexicon term starting with ``prefix`` (ascending).  Resident
        map: one lazily-built sorted key list + bisect range; parquet
        fallback: a row-group-pruned range read over the term-sorted
        lexicon.  ``limit`` is an explicit caller opt-in budget; by default
        expansion is unbounded and a truncating cap raises instead of
        silently diverging from an exhaustive oracle."""
        if not prefix:
            return []
        hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
        if self._map is not None:
            if not hasattr(self, "_sorted_terms"):
                self._sorted_terms = sorted(self._map)
            import bisect

            st = self._sorted_terms
            lo_i = bisect.bisect_left(st, prefix)
            hi_i = bisect.bisect_left(st, hi)
            out = st[lo_i:hi_i]
        else:
            t = self._ds.to_table(
                columns=["term"],
                filter=(pads.field("term") >= prefix) & (pads.field("term") < hi),
            )
            out = sorted(t["term"].to_pylist())
        if limit is not None and len(out) > limit:
            raise ValueError(
                f"wildcard '{prefix}*' expands to {len(out)} terms, over the "
                f"caller's limit={limit}; raise the budget or narrow the prefix"
            )
        return out

    def wildcard_terms(self, pattern: str, limit: int | None = None) -> list[str]:
        """Every lexicon term matching a single-``*`` wildcard pattern
        (ascending): ``p*`` is the sorted-lexicon range probe
        (:meth:`prefix_terms`), ``*s`` a vectorized ends_with sweep over
        the term column, ``a*b`` the prefix range restricted by suffix +
        a length guard (so prefix and suffix never overlap — LIKE 'a%b'
        semantics).  A pure suffix probe uses the REVERSED-term lexicon
        sidecar when one exists (``build_reverse_lexicon`` — the
        10^12-scale path: ``*s`` becomes the same sorted range probe
        ``p*`` uses, over reversed terms); without the sidecar it falls
        back to a vectorized ends_with sweep of the whole vocabulary
        (vocabulary-bounded — the honest no-sidecar baseline, exactly
        like trigram_regex's grouped-pattern fallback)."""
        import pyarrow.compute as _pc

        star = pattern.count("*")
        if star != 1:
            raise ValueError("wildcard pattern needs exactly one '*'")
        pre, suf = pattern.split("*")
        if not pre and not suf:
            raise ValueError("bare '*' would expand to the whole lexicon")
        if pre and not suf:
            return self.prefix_terms(pre, limit)
        if not pre and self._rev_dir and os.path.isdir(self._rev_dir):
            # reversed-lexicon range probe: '*s' == prefix probe of
            # reversed(s) over rev-sorted terms (row-group pruned)
            rp = suf[::-1]
            hi = rp[:-1] + chr(ord(rp[-1]) + 1)
            t = pads.dataset(
                sorted(glob.glob(os.path.join(self._rev_dir, "*.parquet")))
            ).to_table(
                columns=["term"],
                filter=(pads.field("rev_term") >= rp)
                & (pads.field("rev_term") < hi),
            )
            out = sorted(t["term"].to_pylist())
            if limit is not None and len(out) > limit:
                raise ValueError(
                    f"wildcard '{pattern}' expands to {len(out)} terms, "
                    f"over the caller's limit={limit}; narrow the pattern"
                )
            return out
        if self._map is not None:
            if not hasattr(self, "_sorted_terms"):
                self._sorted_terms = sorted(self._map)
            if pre:
                import bisect

                st = self._sorted_terms
                hi = pre[:-1] + chr(ord(pre[-1]) + 1)
                cand = st[bisect.bisect_left(st, pre):bisect.bisect_left(st, hi)]
            else:
                cand = self._sorted_terms
            arr = pa.array(cand, pa.string())
        else:
            if pre:
                hi = pre[:-1] + chr(ord(pre[-1]) + 1)
                t = self._ds.to_table(
                    columns=["term"],
                    filter=(pads.field("term") >= pre)
                    & (pads.field("term") < hi),
                )
            else:
                t = self._ds.to_table(columns=["term"])
            arr = t["term"].combine_chunks()
            cand = None
        mask = _pc.ends_with(arr, pattern=suf)
        if len(pre) + len(suf) > 0:
            mask = _pc.and_(
                mask,
                _pc.greater_equal(
                    _pc.utf8_length(arr), len(pre) + len(suf)
                ),
            )
        out = sorted(set(arr.filter(mask).to_pylist()))
        if limit is not None and len(out) > limit:
            raise ValueError(
                f"wildcard '{pattern}' expands to {len(out)} terms, over "
                f"the caller's limit={limit}; narrow the pattern"
            )
        return out

    def fuzzy_terms(self, term: str) -> list[str]:
        """Every lexicon term within Levenshtein distance <= 1 of ``term``
        (ascending, includes the term itself when present).

        SymSpell candidate generation: two strings within distance 1 always
        share a member of each other's 1-deletion neighborhood (the string
        itself or one single-char deletion), so probing the lazily-built
        deletion-variant index yields a small candidate SUPERSET, verified
        with an exact distance check.  The index costs O(vocab x term_len)
        driver memory, built once; for vocabularies past the resident
        lexicon bound the deletion index would be sharded by variant hash
        alongside the lexicon — this raises rather than silently scanning.
        """
        if self._map is None:
            raise NotImplementedError(
                "fuzzy expansion needs the resident lexicon; shard the "
                "deletion-variant index with the lexicon at this vocab size"
            )
        if not hasattr(self, "_del_index"):
            idx: dict[str, list[str]] = {}
            for t in self._map:
                for v in _deletions1(t):
                    idx.setdefault(v, []).append(t)
            self._del_index = idx
        cands: set[str] = set()
        for v in _deletions1(term):
            cands.update(self._del_index.get(v, ()))
        return sorted(c for c in cands if _within_lev1(term, c))

    def cf(self, terms: list[str]) -> dict[str, int]:
        """term -> collection frequency from the merged lexicon's ``cf``
        column (the reference's A1 counter).  Query terms are few, so this
        is one term-filtered parquet read regardless of residency mode —
        the resident map deliberately holds only df to keep its footprint
        at the BM25 path's needs."""
        if not terms:
            return {}
        t = pads.dataset(self._files).to_table(
            columns=["term", "cf"], filter=pads.field("term").isin(terms)
        )
        out: dict[str, int] = {}
        for term, c in zip(t["term"].to_pylist(), t["cf"].to_pylist()):
            out[term] = out.get(term, 0) + int(c)
        return out

    def idf(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        if not terms:
            return {}
        out: dict[str, tuple[int, float]] = {}
        if self._map is not None:
            pairs = [(t, self._map[t]) for t in terms if t in self._map]
        else:
            t = self._ds.to_table(
                columns=["term", "df"], filter=pads.field("term").isin(terms)
            )
            pairs = list(zip(t["term"].to_pylist(), t["df"].to_pylist()))
        n = self.n
        for term, df in pairs:
            out[term] = (df, math.log((n - df + 0.5) / (df + 0.5) + 1.0))
        return out


def idf_weights(index_dir: str, terms: list[str]) -> dict[str, tuple[int, float]]:
    """term -> (df, idf) from the merged lexicon (one-shot convenience)."""
    stats = load_stats(index_dir)
    return Lexicon(index_dir, stats["N"]).idf(terms)


def build_reverse_lexicon(index_dir: str) -> int:
    """Write the ``lexicon_rev/`` sidecar: (rev_term, term) sorted by the
    REVERSED term — Lucene's ReversedWildcardFilter as an offline
    maintenance pass.  With it, a pure-suffix wildcard (``*s``) is a
    row-group-pruned range probe instead of a vocabulary sweep
    (:meth:`Lexicon.wildcard_terms`).  Tiered like ``merge_lexicon``:
    driver-side when the vocabulary fits, a Ray sort otherwise.  Returns
    the number of terms written; idempotent (rebuilds in place)."""
    import shutil as _shutil

    lex_files = sorted(
        glob.glob(os.path.join(index_dir, "lexicon", "*.parquet"))
    )
    rev_dir = os.path.join(index_dir, "lexicon_rev")
    # tmp-dir + atomic rename publish (the snapshots.py pattern): a crash
    # or concurrent reader never sees a partial sidecar — the directory
    # either is the old complete one, absent, or the new complete one
    tmp_dir = rev_dir + f".tmp-{os.getpid()}"
    if os.path.exists(tmp_dir):
        _shutil.rmtree(tmp_dir)
    # stale tmp/aside dirs from a crashed pass (any pid) are inert to
    # readers (wildcard_terms checks `lexicon_rev` exactly) — reap them
    for stale in glob.glob(rev_dir + ".tmp-*") + glob.glob(rev_dir + ".old-*"):
        _shutil.rmtree(stale, ignore_errors=True)
    total_bytes = sum(os.path.getsize(f) for f in lex_files)
    if total_bytes < 256 << 20:
        os.makedirs(tmp_dir, exist_ok=True)
        t = (
            pa.concat_tables(
                [pq.read_table(f, columns=["term"]) for f in lex_files]
            )
            if lex_files
            else pa.table({"term": pa.array([], pa.string())})
        )
        # vectorized: codepoint reverse + bytewise sort (UTF-8 byte order
        # equals codepoint order, so range probes agree with Python
        # string comparisons) — this runs inside the build finalize now,
        # so no per-term Python loop
        out = pa.table(
            {
                "rev_term": pa.compute.utf8_reverse(t["term"]),
                "term": t["term"],
            }
        ).sort_by([("rev_term", "ascending")])
        pq.write_table(out, os.path.join(tmp_dir, "part-00000.parquet"))
        n = t.num_rows
    else:

        def add_rev(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            return pa.table(
                {
                    "rev_term": _pc.utf8_reverse(t["term"]),
                    "term": t["term"],
                }
            )

        (
            ray.data.read_parquet(lex_files)
            .map_batches(add_rev, batch_format="pyarrow")
            .sort("rev_term")
            .write_parquet(tmp_dir)
        )
        # row count from source parquet metadata — the sort pipeline is
        # lazy and a ds.count() here would re-execute it end to end
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in lex_files)
    # Publish: rename the OLD dir aside first, then rename the new one
    # into place, and rmtree the aside copy LAST.  rmtree(rev_dir) before
    # the rename would leave a window where a crashed pass (or a reader
    # globbing mid-delete) sees a partially deleted dir that still passes
    # the isdir check in wildcard_terms — a truncated vocabulary, silently.
    # With rename-aside, both renames are atomic: readers only ever see
    # the old complete dir, no dir, or the new complete dir.
    aside = rev_dir + f".old-{os.getpid()}"
    if os.path.exists(aside):
        _shutil.rmtree(aside)
    if os.path.exists(rev_dir):
        os.rename(rev_dir, aside)
    os.rename(tmp_dir, rev_dir)
    _shutil.rmtree(aside, ignore_errors=True)
    return n


def find_docs(index_dir: str, col: str, values: list) -> pa.Table:
    """Reverse lookup: docmap entries whose ``col`` matches any of
    ``values`` — the reference's URL -> entry probe (``FindUrl``,
    ``/root/reference/index.h:409``) re-expressed as a predicate-pushdown
    scan over the docmap sidecar parquet (dictionary/statistics pruning
    stands in for the hash probe; at cluster scale the docmap is
    hash-partitioned by the lookup key and the filter prunes to one
    partition's files)."""
    dm_files = sorted(
        glob.glob(os.path.join(index_dir, "chunks", "*", "docmap", "*.parquet"))
    )
    dsx = pads.dataset(dm_files)
    return dsx.to_table(filter=pads.field(col).isin(values))


def _binary_views(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, data) views over a pa.binary array's buffers."""
    if col.offset == 0 and col.null_count == 0:
        offs = np.frombuffer(
            col.buffers()[1], dtype=np.int32, count=len(col) + 1
        ).astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    else:  # sliced/validity edge case: copy once
        raw = b"".join(col.to_pylist())
        lens = pa.compute.binary_length(col).to_numpy(zero_copy_only=False)
        offs = np.zeros(len(col) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        data = np.frombuffer(raw, dtype=np.uint8)
    return offs, data


class _ChunkIndex:
    """In-memory image of one build chunk: term dict + doclens.

    ``style``: the style WIDTH in bits the chunk was built with (bool True
    == 1 for ``BuildConfig.style_head``; 2 for ``style_levels``) — wire tf
    slots carry ``(tf << bits) | class`` (the reference's per-posting
    style/weight bits, ``/root/reference/index.h:44-49``); decoders must
    shift before using tf values.  Skip max_tf and lexicon df/cf are REAL.
    """

    def __init__(self, chunk_dir: str, style: int = 0):
        self.chunk_dir = chunk_dir
        self.terms: dict[str, list[int]] = {}
        self.block_seq: np.ndarray
        self.has_positions = False
        self.style_bits = int(style)
        self.style = bool(style)
        from concurrent.futures import ThreadPoolExecutor

        cols = ["term", "block_seq", "df", "cf", "postings", "skips"]
        files = sorted(glob.glob(os.path.join(chunk_dir, "parts", "*.parquet")))
        if files and "positions" in pq.read_schema(files[0]).names:
            self.has_positions = True
            cols = cols + ["positions"]
        if files:
            # parquet decode releases the GIL — load part files concurrently
            with ThreadPoolExecutor(max_workers=min(8, len(files))) as ex:
                tables = list(ex.map(lambda f: pq.read_table(f, columns=cols), files))
        else:
            tables = []
        t = pa.concat_tables(tables) if tables else None
        if t is None or len(t) == 0:
            self.df = np.empty(0, np.int64)
            self.tf_sum = np.empty(0, np.int64)
            self._post_offs = np.zeros(1, np.int64)
            self._post_data = np.empty(0, np.uint8)
            self.skip_first: list = []
            self.skip_offset: list = []
            self.skip_maxtf: list = []
        else:
            self.df = t["df"].to_numpy(zero_copy_only=False)
            self.tf_sum = t["cf"].to_numpy(zero_copy_only=False)
            self.block_seq = t["block_seq"].to_numpy(zero_copy_only=False)
            # postings stay in the Arrow binary buffer — per-block access is
            # an offset slice (zero-copy), never a to_pylist materialization
            self._post_offs, self._post_data = _binary_views(
                t["postings"].combine_chunks()
            )
            if self.has_positions:
                self._pos_offs, self._pos_data = _binary_views(
                    t["positions"].combine_chunks()
                )
            sk = t["skips"].combine_chunks()
            lo = sk.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lo = lo - lo[0]  # flatten() re-bases the child values
            child = sk.flatten()
            fd = child.field("first_doc").to_numpy(zero_copy_only=False)
            so = child.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
            mt = child.field("max_tf").to_numpy(zero_copy_only=False).astype(np.int64)
            nrows = len(t)
            self.skip_first = [fd[lo[i] : lo[i + 1]] for i in range(nrows)]
            self.skip_offset = [so[lo[i] : lo[i + 1]] for i in range(nrows)]
            self.skip_maxtf = [mt[lo[i] : lo[i + 1]] for i in range(nrows)]
            for i, term in enumerate(t["term"].to_pylist()):
                self.terms.setdefault(term, []).append(i)
            # global block order = docID order (salted blocks of one term come
            # from different pack partitions, so block_seq alone is local)
            for rows in self.terms.values():
                rows.sort(key=lambda i: int(self.skip_first[i][0]))

        # doclens indexed by (docID - doc_min)
        dm_files = sorted(glob.glob(os.path.join(chunk_dir, "docmap", "*.parquet")))
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(dm_files)))) as ex:
            dm = list(
                ex.map(lambda f: pq.read_table(f, columns=["docID", "n_tokens"]), dm_files)
            )
        d = pa.concat_tables(dm)
        ids = d["docID"].to_numpy(zero_copy_only=False)
        toks = d["n_tokens"].to_numpy(zero_copy_only=False)
        self.doc_min = int(ids.min()) if len(ids) else 0
        self.doc_max = int(ids.max()) if len(ids) else -1
        self.doclen = np.zeros(self.doc_max - self.doc_min + 1, dtype=np.float64)
        self.doclen[ids - self.doc_min] = toks

    def posting(self, i: int) -> np.ndarray:
        """Zero-copy view of block i's varint stream."""
        return self._post_data[self._post_offs[i] : self._post_offs[i + 1]]

    def position(self, i: int) -> np.ndarray:
        """Zero-copy view of block i's positions varint stream."""
        return self._pos_data[self._pos_offs[i] : self._pos_offs[i + 1]]


def _eff_tf(ci: _ChunkIndex, tfs: np.ndarray, style_weight) -> np.ndarray:
    """Wire tf slots -> effective tf for scoring.  On a style-built chunk
    the slot is ``(tf << bits) | class``; styled postings score with
    ``tf * weight[class]`` (the reference's rank-time style weighting,
    ``/root/reference/index.h:44-49``).  ``style_weight`` is a scalar on a
    1-bit chunk (weight of the styled class; scalar w on a 2-bit chunk
    weights EVERY non-normal class by w) or a length-2^bits sequence of
    per-class weights (class 0 conventionally 1.0)."""
    b = ci.style_bits
    if not b:
        return tfs
    tf = tfs >> b
    if np.ndim(style_weight) == 0:
        w = float(style_weight)
        if w == 1.0:
            return tf
        return np.where(tfs & ((1 << b) - 1) != 0, tf * w, tf)
    w = np.asarray(style_weight, np.float64)
    if len(w) != 1 << b:
        raise ValueError(
            f"style_weight sequence must have {1 << b} entries for a "
            f"{b}-bit style index"
        )
    return tf * w[tfs & ((1 << b) - 1)]


def _style_wmax(ci: _ChunkIndex, style_weight) -> float:
    """Soundness multiplier for block-max bounds: skip max_tf is REAL tf,
    so a styled posting can reach tf * max(weight)."""
    if not ci.style_bits:
        return 1.0
    m = (
        float(np.max(np.asarray(style_weight, np.float64)))
        if np.ndim(style_weight)
        else float(style_weight)
    )
    return m if m > 1.0 else 1.0


def _score_chunk(
    ci: _ChunkIndex,
    terms: list[str],
    idfs: np.ndarray,
    k: int,
    avgdl: float,
    prune: bool,
    excluded: np.ndarray | None = None,
    style_weight: float = 1.0,
    after: tuple[float, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Score one chunk -> (top docIDs, scores), deterministic order.

    ``excluded``: docIDs barred from the results (boolean NOT); their
    contributions are masked at decode time so the prune threshold tau is
    never inflated by a doc that can't be returned.

    ``style_weight`` (style-built chunks only, must be >= 1): styled
    postings score with ``tf * style_weight``; skip max_tf is real tf, so
    pruning bounds are multiplied by the weight to stay sound.

    ``after`` = (score, docID): a pagination cursor — only candidates
    STRICTLY after it in the (score DESC, docID ASC) result order survive.
    Callers must pass ``prune=False`` with a cursor: tau forms from the
    best UNFILTERED candidates, which all sort at-or-before the cursor, so
    it would over-prune the page's true members.  Scores are identical
    either way (pruning is score-lossless), so cursor equality against a
    page-1 score is exact float64 equality.
    """
    if after is not None and prune:
        raise ValueError("after-cursor scoring requires prune=False")
    base = ci.doc_min
    scores = np.zeros_like(ci.doclen)
    norm_dl = K1 * (1.0 - B + B * ci.doclen / avgdl)
    allowed: np.ndarray | None = None
    if excluded is not None and len(excluded):
        inr = excluded[(excluded >= base) & (excluded <= ci.doc_max)] - base
        if len(inr):
            allowed = np.ones(len(ci.doclen), dtype=bool)
            allowed[inr] = False

    # upper bound per term: shortest-doc assumption (dl -> 0 lower-bounds
    # the denominator at tf + k1*(1-b)); monotone in tf => block max valid
    def ub(tf_max: np.ndarray | float, idf: float) -> np.ndarray | float:
        return idf * (K1 + 1.0) * tf_max / (tf_max + K1 * (1.0 - B))

    present = [
        (term, idfs[j], ci.terms[term]) for j, term in enumerate(terms) if term in ci.terms
    ]
    if not present:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    # skip max_tf is REAL tf; a styled posting can reach tf * max(weight)
    wmax = _style_wmax(ci, style_weight)
    remaining_ub = np.array(
        [
            ub(wmax * max(float(ci.skip_maxtf[i].max()) for i in rows), idf)
            for _, idf, rows in present
        ]
    )
    tail_ub = np.concatenate([np.cumsum(remaining_ub[::-1])[::-1], [0.0]])

    tau = -np.inf  # k-th best partial score so far
    for j, (term, idf, rows) in enumerate(present):
        for i in rows:
            df_i = int(ci.df[i])
            if prune and tau > -np.inf:
                # sub-block level: partial-score range-max + this sub-block's
                # UB + all later terms' UBs can't reach tau => skip decode.
                # reduceat segments run to the next sub-block start (last one
                # to chunk end) — conservative, hence sound.
                sfirst = ci.skip_first[i]
                sub_ub = ub(wmax * ci.skip_maxtf[i].astype(np.float64), idf)
                pmax = np.maximum.reduceat(scores, sfirst - base)
                keep = (pmax + sub_ub + tail_ub[j + 1]) >= tau
                if not keep.all():
                    docs, tfs = unpack_subblocks(
                        ci.posting(i), df_i, ci.skip_offset[i], np.flatnonzero(keep)
                    )
                else:
                    docs, tfs = unpack_block(ci.posting(i), df_i)
            else:
                docs, tfs = unpack_block(ci.posting(i), df_i)
            if len(docs) == 0:
                continue
            idx = docs - base
            if allowed is not None:
                m = allowed[idx]
                idx, tfs = idx[m], tfs[m]
                if len(idx) == 0:
                    continue
            tfe = _eff_tf(ci, tfs, style_weight)
            contrib = idf * (tfe * (K1 + 1.0)) / (tfe + norm_dl[idx])
            scores[idx] += contrib  # (term, doc) unique => no collision
        if prune:
            nz = np.flatnonzero(scores)
            if len(nz) >= k:
                tau = np.partition(scores[nz], len(nz) - k)[len(nz) - k]

    nz = np.flatnonzero(scores)
    if after is not None and len(nz):
        cs, cd = after
        snz = scores[nz]
        nz = nz[(snz < cs) | ((snz == cs) & (nz + base > cd))]
    if len(nz) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    order = np.lexsort((nz, -scores[nz]))[:k]
    top = nz[order]
    return top + base, scores[top]


def _score_chunk_bm25f(
    ci: _ChunkIndex,
    terms: list[str],
    idfs: np.ndarray,
    k: int,
    H: int,
    w_head: float,
    w_body: float,
    avg_h: float,
    avg_b: float,
    excluded: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """True BM25F over the head/body field split (Robertson & Zaragoza,
    "The Probabilistic Relevance Framework", 2009 §6.2): per-field tf is
    length-normalized and weight-blended BEFORE the k1 saturation —

        tfw(t, d) = w_body * tf_body / B_body(d) + w_head * tf_head / B_head(d)
        score     = sum_t idf(t) * tfw * (k1 + 1) / (tfw + k1)

    which is NOT the same ranking as adding two per-field BM25 scores
    (``boost={"head": w}``): a term hit in both fields saturates once on
    the blended tf, so BM25F rewards covering more query terms over
    stacking one term's fields.  Field decomposition: head = first H
    tokens (the ``head:`` marker namespace), body = rest; tf_body =
    tf_content - tf_head needs both posting lists, decoded into dense
    per-term field-tf arrays (no pruning in this mode — the block-max
    bound would need per-field maxima the skips don't carry; documented
    trade-off, the fan-out/merge shape is unchanged)."""
    base = ci.doc_min
    dl = ci.doclen
    lh = np.minimum(dl, float(H))
    lb = dl - lh
    Bh = (1.0 - B) + B * lh / avg_h if avg_h > 0 else np.ones_like(dl)
    Bb = (1.0 - B) + B * lb / avg_b if avg_b > 0 else np.ones_like(dl)
    scores = np.zeros_like(dl)
    tfc = np.zeros_like(dl)
    tfh = np.zeros_like(dl)
    allowed: np.ndarray | None = None
    if excluded is not None and len(excluded):
        inr = excluded[(excluded >= base) & (excluded <= ci.doc_max)] - base
        if len(inr):
            allowed = np.ones(len(dl), dtype=bool)
            allowed[inr] = False

    any_hit = False
    for j, term in enumerate(terms):
        touched = []
        for key, acc in ((term, tfc), (f"head:{term}", tfh)):
            for i in ci.terms.get(key, []):
                docs, tfs = unpack_block(ci.posting(i), int(ci.df[i]))
                idx = docs - base
                if allowed is not None:
                    m = allowed[idx]
                    idx, tfs = idx[m], tfs[m]
                if len(idx) == 0:
                    continue
                acc[idx] += tfs
                touched.append(idx)
        if not touched:
            continue
        any_hit = True
        u = np.unique(np.concatenate(touched))
        body = tfc[u] - tfh[u]
        tfw = w_body * body / Bb[u] + w_head * tfh[u] / Bh[u]
        scores[u] += idfs[j] * (tfw * (K1 + 1.0)) / (tfw + K1)
        tfc[u] = 0.0
        tfh[u] = 0.0
    if not any_hit:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    nz = np.flatnonzero(scores)
    if len(nz) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    order = np.lexsort((nz, -scores[nz]))[:k]
    top = nz[order]
    return top + base, scores[top]


def _excluded_docs(ci: _ChunkIndex, terms: list[str]) -> np.ndarray:
    """Union of this chunk's docIDs containing ANY of ``terms`` — the
    boolean-NOT membership set (the complement side of the reference's
    ``Seek`` intersection surface, ``/root/reference/index.h:141``)."""
    parts = []
    for t in terms:
        for i in ci.terms.get(t, []):
            docs, _ = unpack_block(ci.posting(i), int(ci.df[i]))
            parts.append(docs)
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def _score_chunk_lm(
    ci: _ChunkIndex,
    terms: list[str],
    cfs: np.ndarray,
    total_tokens: float,
    k: int,
    mu: float,
    excluded: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Query-likelihood scoring with Dirichlet smoothing over one chunk
    (Zhai & Lafferty 2001) — a second ranking model over the SAME posting
    lists/doclens the BM25 path reads, proving the index is
    ranker-agnostic (the reference hard-codes BM25-ish scoring at rank
    time; its postings carry only (doc, tf), exactly what LM needs too).

    Contract (mirrored verbatim by ``lm_dirichlet_sql_oracle`` and the
    brute-force test oracle):

        score(q, d) = sum_{t in q, tf_td > 0} ln(1 + tf_td / ((mu*cf_t)/C))
                      + m_d * ln(mu / (dl_d + mu))

    where ``cf_t`` is the term's collection frequency, ``C`` total corpus
    tokens, ``dl_d`` the doc length and ``m_d`` the number of DISTINCT
    query terms matching d.  Only docs matching >= 1 term are returned
    (the rank-invariant constant part of the true log-likelihood is
    dropped, as in Lucene's LMDirichletSimilarity).  Float64 op order is
    fixed — ascending term order, ``(mu*cf)/C`` before the division,
    ``ln(1.0 + x)`` not log1p — so engine/oracle scores match bitwise.

    No block-max pruning: the dl term is negative and per-doc, so the
    BM25 path's monotone upper bounds don't transfer; chunks score dense
    (bounded by ``chunk_docs``), which is the same cost envelope as an
    unpruned BM25 chunk scan.
    """
    base = ci.doc_min
    scores = np.zeros_like(ci.doclen)
    m = np.zeros(len(ci.doclen), dtype=np.int64)
    for j, term in enumerate(terms):
        rows = ci.terms.get(term)
        if not rows:
            continue
        denom = (mu * float(cfs[j])) / total_tokens
        for i in rows:
            docs, tfs = unpack_block(ci.posting(i), int(ci.df[i]))
            if len(docs) == 0:
                continue
            idx = docs - base
            tfe = _eff_tf(ci, tfs, 1.0)  # real tf on style-built chunks
            scores[idx] += np.log(1.0 + tfe / denom)
            m[idx] += 1  # (term, doc) unique => distinct-term counter
    if excluded is not None and len(excluded):
        inr = excluded[(excluded >= base) & (excluded <= ci.doc_max)] - base
        if len(inr):
            m[inr] = 0
    nz = np.flatnonzero(m)
    if len(nz) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    scores[nz] += m[nz] * np.log(mu / (ci.doclen[nz] + mu))
    order = np.lexsort((nz, -scores[nz]))[:k]
    top = nz[order]
    return top + base, scores[top]


def _decode_for_candidates(
    ci: _ChunkIndex, rows: list[int], cand: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a term's postings restricted to sub-blocks that can contain
    ``cand`` docIDs — the skip-seek path (the reference's ``Seek``
    extension point, ``/root/reference/index.h:141``, realized over the
    skip arrays instead of a posting iterator).

    Returns (docs, tfs) concatenated over the term's blocks, docID-ascending
    (rows are pre-sorted by first doc; blocks cover disjoint docID ranges).
    """
    docs_out, tfs_out = [], []
    for i in rows:
        df_i = int(ci.df[i])
        sfirst = ci.skip_first[i]
        # sub-block j covers [sfirst[j], sfirst[j+1]); select those hit by cand
        hit = np.searchsorted(sfirst, cand, side="right") - 1
        hit = np.unique(hit[hit >= 0])
        if len(hit) == 0:
            continue
        if len(hit) * SKIP_INTERVAL >= df_i:
            docs, tfs = unpack_block(ci.posting(i), df_i)
        else:
            docs, tfs = unpack_subblocks(
                ci.posting(i), df_i, ci.skip_offset[i], hit
            )
        docs_out.append(docs)
        tfs_out.append(tfs)
    if not docs_out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(docs_out), np.concatenate(tfs_out)


def _and_candidates(
    ci: _ChunkIndex, terms: list[str]
) -> tuple[np.ndarray, list[tuple[np.ndarray, np.ndarray]]]:
    """Conjunctive candidate set for one chunk: docs containing ALL terms.

    Rarest-first intersection with skip-seek decoding; returns the final
    candidates plus each term's decoded (docs, tfs) superset (aligned with
    ``terms`` order) for scoring.
    """
    empty = np.empty(0, np.int64)
    rows_per_term = []
    for t in terms:
        rows = ci.terms.get(t)
        if not rows:
            return empty, []
        rows_per_term.append(rows)
    order = np.argsort([sum(int(ci.df[i]) for i in rows) for rows in rows_per_term])
    decoded: list = [None] * len(terms)
    cand: np.ndarray | None = None
    for j in order:
        rows = rows_per_term[j]
        if cand is None:  # rarest term: full decode seeds the candidates
            parts = [unpack_block(ci.posting(i), int(ci.df[i])) for i in rows]
            docs = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
        else:
            docs, tfs = _decode_for_candidates(ci, rows, cand)
        decoded[j] = (docs, tfs)
        cand = docs if cand is None else cand[np.isin(cand, docs, assume_unique=True)]
        if len(cand) == 0:
            return empty, []
    return cand, decoded


def _score_chunk_and(
    ci: _ChunkIndex,
    terms: list[str],
    idfs: np.ndarray,
    k: int,
    avgdl: float,
    excluded: np.ndarray | None = None,
    style_weight: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Conjunctive BM25: score only docs containing every query term."""
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cand, decoded = _and_candidates(ci, terms)
    if excluded is not None and len(excluded) and len(cand):
        cand = cand[~np.isin(cand, excluded)]
    if len(cand) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    norm_dl = K1 * (1.0 - B + B * ci.doclen[cand - ci.doc_min] / avgdl)
    scores = np.zeros(len(cand), dtype=np.float64)
    for j in range(len(terms)):  # ascending term order: oracle-identical sums
        docs, tfs = decoded[j]
        pos = np.searchsorted(docs, cand)
        # cand subset of docs by construction
        tf = _eff_tf(ci, tfs[pos], style_weight).astype(np.float64)
        scores += idfs[j] * (tf * (K1 + 1.0)) / (tf + norm_dl)
    order = np.lexsort((cand, -scores))[:k]
    return cand[order], scores[order]


def _score_chunk_msm(
    ci: _ChunkIndex,
    terms: list[str],
    idfs: np.ndarray,
    k: int,
    avgdl: float,
    msm: int,
    excluded: np.ndarray | None = None,
    style_weight: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-should-match BM25: only docs matching >= ``msm`` DISTINCT
    query terms are scored (the middle ground between OR and AND).

    No block-max pruning here — skipping a sub-block could lose a doc's
    match COUNT (not just score mass) and wrongly disqualify it, so the
    sound fast paths are msm=1 (plain pruned OR) and msm=len(terms)
    (skip-seek AND), both dispatched by the caller; the general case
    decodes every present term's postings once, like the OR path unpruned.
    ``terms`` must be distinct (the query pipeline dedups them)."""
    base = ci.doc_min
    scores = np.zeros_like(ci.doclen)
    nmatch = np.zeros(len(ci.doclen), dtype=np.int64)
    norm_dl = K1 * (1.0 - B + B * ci.doclen / avgdl)
    allowed: np.ndarray | None = None
    if excluded is not None and len(excluded):
        inr = excluded[(excluded >= base) & (excluded <= ci.doc_max)] - base
        if len(inr):
            allowed = np.ones(len(ci.doclen), dtype=bool)
            allowed[inr] = False
    present = [
        (idfs[j], ci.terms[term]) for j, term in enumerate(terms) if term in ci.terms
    ]
    if len(present) < msm:  # a doc can only match terms this chunk holds
        return np.empty(0, np.int64), np.empty(0, np.float64)
    for idf, rows in present:
        for i in rows:
            docs, tfs = unpack_block(ci.posting(i), int(ci.df[i]))
            if len(docs) == 0:
                continue
            idx = docs - base
            if allowed is not None:
                m = allowed[idx]
                idx, tfs = idx[m], tfs[m]
                if len(idx) == 0:
                    continue
            tfe = _eff_tf(ci, tfs, style_weight)
            scores[idx] += idf * (tfe * (K1 + 1.0)) / (tfe + norm_dl[idx])
            nmatch[idx] += 1  # (term, doc) unique => one hit per term
    qual = np.flatnonzero(nmatch >= msm)
    if len(qual) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    order = np.lexsort((qual, -scores[qual]))[:k]
    top = qual[order]
    return top + base, scores[top]


def _term_occurrences(
    ci: _ChunkIndex, uniq: list[str], cand: np.ndarray
) -> dict[str, tuple[np.ndarray, np.ndarray]] | None:
    """Per term: (doc, within-doc position) occurrence arrays restricted to
    the candidate docs; None if any term has no occurrence among them."""
    occs: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in uniq:
        docs_parts, pos_parts = [], []
        for i in ci.terms[t]:
            df_i = int(ci.df[i])
            docs, tfs = unpack_block(ci.posting(i), df_i)
            if ci.style:
                tfs = tfs >> ci.style_bits  # positions stream sized by REAL tf
            lo = np.searchsorted(docs, cand[0])
            hi = np.searchsorted(docs, cand[-1], side="right")
            if lo == hi:
                continue
            sel = np.flatnonzero(np.isin(docs[lo:hi], cand, assume_unique=True)) + lo
            if len(sel) == 0:
                continue
            pos_flat = unpack_positions(ci.position(i), tfs)
            occ_starts = np.zeros(df_i, dtype=np.int64)
            np.cumsum(tfs[:-1], out=occ_starts[1:])
            lens_sel = tfs[sel]
            excl = np.zeros(len(sel), dtype=np.int64)
            np.cumsum(lens_sel[:-1], out=excl[1:])
            tot = int(lens_sel.sum())
            oidx = np.repeat(occ_starts[sel], lens_sel) + (
                np.arange(tot) - np.repeat(excl, lens_sel)
            )
            docs_parts.append(np.repeat(docs[sel], lens_sel))
            pos_parts.append(pos_flat[oidx])
        if not docs_parts:
            return None
        occs[t] = (np.concatenate(docs_parts), np.concatenate(pos_parts))
    return occs


def _near_chunk(
    ci: _ChunkIndex, term_a: str, term_b: str, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Docs where ``term_a`` occurs within ``window`` token positions of
    ``term_b`` -> (docIDs, n_matches = a-occurrences with a near b).

    Proximity generalizes the phrase path's positional verify: candidates
    from the conjunctive skip-seek intersection, then one vectorized
    sorted-key range probe — an a-occurrence (doc, p) matches iff the
    b-occurrence key stream intersects [doc<<32 | p-w, doc<<32 | p+w]
    (within-doc positions are uint32 by the pack contract, so the +-w
    offsets never cross a doc boundary in key space)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if not ci.has_positions:
        raise ValueError("index built without positions — rebuild with positions=True")
    uniq = sorted({term_a, term_b})
    cand, _ = _and_candidates(ci, uniq)
    if len(cand) == 0:
        return empty
    occs = _term_occurrences(ci, uniq, cand)
    if occs is None:
        return empty
    da, pa_ = occs[term_a]
    db, pb = occs[term_b]
    ka = da.astype(np.int64) * (1 << 32) + pa_
    order = np.argsort(ka)
    ka = ka[order]
    da_s = da[order]
    kb = np.sort(db.astype(np.int64) * (1 << 32) + pb)
    lo = np.searchsorted(kb, ka - window)
    hi = np.searchsorted(kb, ka + window, side="right")
    hit = hi > lo
    if not hit.any():
        return empty
    mdocs, mcounts = np.unique(da_s[hit], return_counts=True)
    return mdocs.astype(np.int64), mcounts.astype(np.int64)


def _phrase_chunk(ci: _ChunkIndex, ordered_terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Docs of this chunk containing the exact phrase -> (docIDs, n_matches).

    Candidates come from the conjunctive skip-seek intersection; adjacency
    is verified over the positional streams: the phrase starts at p iff for
    every ordinal i, term_i occurs at position p + i.  Verification is the
    vectorized "count distinct ordinals per (doc, p)" trick — per ordinal a
    (doc, pos - i) key appears at most once, so a key reaching
    len(ordered_terms) is a full phrase match.
    """
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if not ci.has_positions:
        raise ValueError("index built without positions — rebuild with positions=True")
    if not ordered_terms:
        return empty
    uniq = sorted(set(ordered_terms))
    cand, _ = _and_candidates(ci, uniq)
    if len(cand) == 0:
        return empty
    occs = _term_occurrences(ci, uniq, cand)
    if occs is None:
        return empty
    # adjacency: count ordinals agreeing on (doc, start = pos - ordinal)
    n_ord = len(ordered_terms)
    keys_parts = []
    for i, t in enumerate(ordered_terms):
        docs, pos = occs[t]
        padj = pos - i
        ok = padj >= 0
        keys_parts.append(docs[ok].astype(np.int64) * (1 << 32) + padj[ok])
    keys = np.concatenate(keys_parts)
    uk, counts = np.unique(keys, return_counts=True)
    full = uk[counts == n_ord]
    if len(full) == 0:
        return empty
    mdocs, mcounts = np.unique(full >> 32, return_counts=True)
    return mdocs.astype(np.int64), mcounts.astype(np.int64)


@ray.remote
class SearchShard:
    """Stateful query actor: loads its chunks once, serves score requests."""

    def __init__(
        self,
        chunk_dirs: list[str],
        avgdl: float,
        tombstones: np.ndarray | None = None,
        style: int = 0,
    ):
        self.chunks = [_ChunkIndex(d, style=style) for d in chunk_dirs]
        self.avgdl = avgdl
        # sorted unique docIDs logically deleted but not yet compacted away;
        # barred from every result (scores keep the pre-delete stats)
        self.tombstones = (
            tombstones if tombstones is not None and len(tombstones) else None
        )

    def ready(self) -> bool:
        return True

    def _mask_tomb(self, docs: np.ndarray) -> np.ndarray:
        if self.tombstones is None or len(docs) == 0:
            return np.ones(len(docs), dtype=bool)
        return ~np.isin(docs, self.tombstones)

    def score_many(
        self,
        queries: list[tuple[list[str], list[float], int]],
        prune: bool,
        mode: str = "or",
        excludes: list[list[str]] | None = None,
        style_weight: float = 1.0,
        msm: int = 2,
        afters: list[tuple[float, int] | None] | None = None,
        avgdl: float | None = None,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        # avgdl override: an NRT caller merges the durable index's stats
        # with its in-memory segment, so the effective avgdl differs from
        # the one this actor was loaded with (block-max bounds stay sound:
        # tau forms from scores computed under the SAME override)
        av = self.avgdl if avgdl is None else float(avgdl)
        out = []
        for qi, (terms, idfs, k) in enumerate(queries):
            exc_terms = excludes[qi] if excludes else []
            after = afters[qi] if afters else None
            tops, scs = [], []
            for ci in self.chunks:
                if mode == "and":
                    t, s = _score_chunk_and(
                        ci, terms, np.asarray(idfs), k, av,
                        excluded=self.tombstones, style_weight=style_weight,
                    )
                elif mode == "msm":
                    t, s = _score_chunk_msm(
                        ci, terms, np.asarray(idfs), k, av, msm,
                        excluded=self.tombstones, style_weight=style_weight,
                    )
                else:
                    exc = _excluded_docs(ci, exc_terms) if exc_terms else None
                    if self.tombstones is not None:
                        exc = (
                            np.union1d(exc, self.tombstones)
                            if exc is not None
                            else self.tombstones
                        )
                    t, s = _score_chunk(
                        ci, terms, np.asarray(idfs), k, av,
                        prune and after is None, exc,
                        style_weight=style_weight, after=after,
                    )
                tops.append(t)
                scs.append(s)
            out.append((np.concatenate(tops), np.concatenate(scs)))
        return out

    def field_len_sums(self, H: int) -> tuple[float, float]:
        """(sum of min(dl, H), sum of dl) over this shard's docs — the
        per-shard partials the driver merges into exact BM25F per-field
        average lengths (absent docIDs in the dense doclen are zeros and
        contribute nothing)."""
        sh = sb = 0.0
        for ci in self.chunks:
            dl = ci.doclen
            sh += float(np.minimum(dl, float(H)).sum())
            sb += float(dl.sum())
        return sh, sb

    def bm25f_many(
        self,
        queries: list[tuple[list[str], list[float], int]],
        H: int,
        w_head: float,
        w_body: float,
        avg_h: float,
        avg_b: float,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        out = []
        for terms, idfs, k in queries:
            tops, scs = [], []
            for ci in self.chunks:
                t, s = _score_chunk_bm25f(
                    ci, terms, np.asarray(idfs), k, H, w_head, w_body,
                    avg_h, avg_b, excluded=self.tombstones,
                )
                tops.append(t)
                scs.append(s)
            out.append((np.concatenate(tops), np.concatenate(scs)))
        return out

    def lm_many(
        self,
        queries: list[tuple[list[str], list[int], int]],
        total_tokens: float,
        mu: float,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Query-likelihood Dirichlet LM scoring (``_score_chunk_lm``):
        one (terms, collection-frequencies, k) triple per query."""
        out = []
        for terms, cfs, k in queries:
            tops, scs = [], []
            cf_arr = np.asarray(cfs, dtype=np.float64)
            for ci in self.chunks:
                t, s = _score_chunk_lm(
                    ci, terms, cf_arr, total_tokens, k, mu,
                    excluded=self.tombstones,
                )
                tops.append(t)
                scs.append(s)
            out.append((np.concatenate(tops), np.concatenate(scs)))
        return out

    def _score_with_exclusions(
        self,
        queries: list[tuple[list[str], list[float], int]],
        prune: bool,
        exc_per_chunk: list[np.ndarray],
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """OR-mode scoring with a per-chunk precomputed exclusion set —
        the shared engine under categorical and numeric filtered
        retrieval (same exclusion channel as tombstones/NOT, so pruning
        stays score-lossless over the allowed set)."""
        out = []
        for terms, idfs, k in queries:
            tops, scs = [], []
            for ci, exc in zip(self.chunks, exc_per_chunk):
                t, s = _score_chunk(
                    ci, terms, np.asarray(idfs), k, self.avgdl, prune,
                    exc if len(exc) else None,
                )
                tops.append(t)
                scs.append(s)
            out.append((np.concatenate(tops), np.concatenate(scs)))
        return out

    def score_filtered_many(
        self,
        queries: list[tuple[list[str], list[float], int]],
        prune: bool,
        filter_col: str,
        filter_vals: list,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Scoring restricted to docs whose ``filter_col`` docmap value is
        in ``filter_vals``; the facet map is actor-resident
        (``_facet_maps``), per-call cost one vectorized isin per chunk."""
        vals = set(filter_vals)
        exc_per_chunk = []
        for ids, codes, cats in self._facet_maps(filter_col):
            ok = np.array(
                [j for j, c in enumerate(cats) if c in vals], dtype=np.int64
            )
            exc = ids[~np.isin(codes, ok)]
            if self.tombstones is not None:
                exc = np.union1d(exc, self.tombstones)
            exc_per_chunk.append(exc)
        return self._score_with_exclusions(queries, prune, exc_per_chunk)

    def _facet_maps(self, facet_col: str):
        """Per-chunk (sorted docIDs, facet codes, categories) — loaded from
        the docmap sidecars ONCE per actor per facet column, then resident
        (the aggregation-pushdown state a faceted search engine keeps)."""
        import pandas as pd

        cache = getattr(self, "_facet_cache", None)
        if cache is None:
            cache = self._facet_cache = {}
        if facet_col not in cache:
            maps = []
            for ci in self.chunks:
                dm_files = sorted(
                    glob.glob(os.path.join(ci.chunk_dir, "docmap", "*.parquet"))
                )
                d = pa.concat_tables(
                    [pq.read_table(f, columns=["docID", facet_col]) for f in dm_files]
                )
                ids = d["docID"].to_numpy(zero_copy_only=False)
                codes, cats = pd.factorize(d[facet_col].to_numpy(zero_copy_only=False))
                codes = codes.astype(np.int64)
                cats = list(cats)
                if (codes < 0).any():  # factorize marks nulls -1; give them
                    codes = codes.copy()  # a real (None) facet bucket so
                    codes[codes < 0] = len(cats)  # bincount can't underflow
                    cats.append(None)
                order = np.argsort(ids)
                maps.append((ids[order], codes[order], cats))
            cache[facet_col] = maps
        return cache[facet_col]

    def facet_many(
        self, queries: list[list[str]], facet_col: str
    ) -> list[dict[str, int]]:
        """Per query: facet-value -> count of live documents matching ANY
        query term — the counts side of a faceted search (aggregations over
        the full match set, not the top-k).  Counts are exact: each doc
        lives in exactly one chunk, so per-chunk bincounts sum cleanly."""
        maps = self._facet_maps(facet_col)
        out = []
        for terms in queries:
            agg: dict[str, int] = {}
            for ci, (ids, codes, cats) in zip(self.chunks, maps):
                docs = _excluded_docs(ci, terms)
                if len(docs) == 0:
                    continue
                docs = docs[self._mask_tomb(docs)]
                if len(docs) == 0:
                    continue
                bc = np.bincount(
                    codes[np.searchsorted(ids, docs)], minlength=len(cats)
                )
                for j, cat in enumerate(cats):
                    if bc[j]:
                        agg[cat] = agg.get(cat, 0) + int(bc[j])
            out.append(agg)
        return out

    def collapse_many(
        self,
        queries: list[tuple[list[str], list[float], int]],
        facet_col: str,
        cap: int,
    ) -> list[tuple[np.ndarray, np.ndarray, list[str]]]:
        """Field collapsing (Elasticsearch ``collapse``): per query, this
        shard's per-facet-group top-``cap`` candidates with exact BM25
        scores.  Per-shard per-group top-cap is a sound combiner — group
        membership is a docmap property, docs are disjoint across chunks,
        so the GLOBAL per-group top-cap is a subset of the union of shard
        top-caps.  Dense (prune=False) chunk scans: a top-k prune bound
        is per-query, not per-group, and would starve small groups."""
        maps = self._facet_maps(facet_col)
        out = []
        for terms, idfs, _k in queries:
            dd: list[np.ndarray] = []
            ss: list[np.ndarray] = []
            gg: list[str] = []
            for ci, (ids, codes, cats) in zip(self.chunks, maps):
                t, s = _score_chunk(
                    ci, terms, np.asarray(idfs), len(ci.doclen) or 1,
                    self.avgdl, False, excluded=self.tombstones,
                )
                if len(t) == 0:
                    continue
                gcodes = codes[np.searchsorted(ids, t)]
                # t is already (score desc, docID asc); stable group sort
                # preserves that order inside each group
                order = np.argsort(gcodes, kind="stable")
                sg = gcodes[order]
                _, start, inv = np.unique(sg, return_index=True, return_inverse=True)
                in_rank = np.arange(len(sg)) - start[inv]
                keep = order[in_rank < cap]
                dd.append(t[keep])
                ss.append(s[keep])
                gg.extend(str(cats[c]) for c in gcodes[keep])
            if not dd:
                out.append(
                    (np.empty(0, np.int64), np.empty(0, np.float64), [])
                )
                continue
            docs = np.concatenate(dd)
            scores = np.concatenate(ss)
            # shard-level re-cap across chunks shrinks the driver payload
            order = np.lexsort((docs, -scores))
            gid_of = {}
            gids = np.fromiter(
                (gid_of.setdefault(g, len(gid_of)) for g in gg),
                dtype=np.int64,
                count=len(gg),
            )
            sg = gids[order]
            order2 = np.argsort(sg, kind="stable")
            sg2 = sg[order2]
            _, start, inv = np.unique(sg2, return_index=True, return_inverse=True)
            in_rank = np.arange(len(sg2)) - start[inv]
            keep = order[order2[in_rank < cap]]
            names = list(gid_of)
            out.append(
                (docs[keep], scores[keep], [names[g] for g in gids[keep]])
            )
        return out

    def match_many(
        self, queries: list[list[str]], mode: str = "or"
    ) -> list[np.ndarray]:
        """Per query: the FULL live match set (docIDs, unsorted) — the
        index as a filter, not a ranker.  mode="or": any term; "and":
        every term.  AND is a per-chunk sorted-set intersection, correct
        globally because each doc's postings live in exactly one chunk."""
        out = []
        for terms in queries:
            per_chunk = []
            for ci in self.chunks:
                if mode == "or":
                    docs = _excluded_docs(ci, terms)
                else:
                    docs = _excluded_docs(ci, terms[:1])
                    for t in terms[1:]:
                        if docs.size == 0:
                            break
                        docs = np.intersect1d(
                            docs, _excluded_docs(ci, [t]), assume_unique=True
                        )
                if docs.size:
                    docs = docs[self._mask_tomb(docs)]
                per_chunk.append(docs)
            out.append(
                np.concatenate(per_chunk)
                if per_chunk
                else np.empty(0, np.int64)
            )
        return out

    def score_range_many(
        self,
        queries: list[tuple[list[str], list[float], int]],
        prune: bool,
        value_col: str,
        lo: int | None,
        hi: int | None,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """OR-mode scoring restricted to docs whose integer docmap
        ``value_col`` lies in [lo, hi] — the numeric twin of
        ``score_filtered_many``, same exclusion channel."""
        exc_per_chunk = []
        for ids, vals in self._value_maps(value_col):
            bad = np.zeros(len(ids), dtype=bool)
            if lo is not None:
                bad |= vals < lo
            if hi is not None:
                bad |= vals > hi
            exc = ids[bad]
            if self.tombstones is not None:
                exc = np.union1d(exc, self.tombstones)
            exc_per_chunk.append(exc)
        return self._score_with_exclusions(queries, prune, exc_per_chunk)

    def score_function_many(
        self,
        queries: list[tuple[list[str], list[float], int]],
        value_col: str,
        scale: float,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """FUNCTION SCORE (the Elasticsearch ``function_score`` with a
        ``field_value_factor``): final = bm25 * (1 + ln(1 + value/scale))
        over an integer docmap column — longer/better-valued docs get a
        multiplicative prior.  Block-max pruning is off: the bound is not
        valid under a per-doc multiplier (a per-chunk max-factor bound
        would restore it — documented trade-off); only k rows per chunk
        leave the actor either way."""
        out = []
        vmaps = self._value_maps(value_col)
        for terms, idfs, k in queries:
            tops, scs = [], []
            for ci, (vids, vvals) in zip(self.chunks, vmaps):
                t, s = _score_chunk(
                    ci, terms, np.asarray(idfs), 1 << 30, self.avgdl,
                    False, self.tombstones,
                )
                if len(t):
                    pos = np.searchsorted(vids, t)
                    s = s * (1.0 + np.log(1.0 + vvals[pos] / scale))
                    order = np.lexsort((t, -s))[:k]
                    t, s = t[order], s[order]
                tops.append(t)
                scs.append(s)
            out.append((np.concatenate(tops), np.concatenate(scs)))
        return out

    def sort_by_value_many(
        self,
        queries: list[list[str]],
        value_col: str,
        k: int,
        desc: bool = True,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Per query: the k best MATCHING docs ordered by an integer
        docmap column (Elasticsearch sort-by-field, no relevance score):
        the full match set never leaves the actor — each chunk looks its
        matches up in the resident value map and contributes only its own
        k best (value desc/asc, docID asc ties)."""
        out = []
        vmaps = self._value_maps(value_col)
        for terms in queries:
            tops, vals = [], []
            for ci, (vids, vvals) in zip(self.chunks, vmaps):
                m = _excluded_docs(ci, terms)  # = the OR match set
                if self.tombstones is not None and len(m):
                    m = m[~np.isin(m, self.tombstones)]
                if len(m) == 0:
                    tops.append(np.empty(0, np.int64))
                    vals.append(np.empty(0, np.int64))
                    continue
                v = vvals[np.searchsorted(vids, m)]
                order = np.lexsort((m, -v if desc else v))[:k]
                tops.append(m[order])
                vals.append(v[order])
            out.append((np.concatenate(tops), np.concatenate(vals)))
        return out

    def _value_maps(self, value_col: str):
        """Per-chunk (sorted docIDs, int64 values) from the docmap sidecars
        — resident after first use (numeric twin of ``_facet_maps``)."""
        cache = getattr(self, "_value_cache", None)
        if cache is None:
            cache = self._value_cache = {}
        if value_col not in cache:
            maps = []
            for ci in self.chunks:
                dm_files = sorted(
                    glob.glob(os.path.join(ci.chunk_dir, "docmap", "*.parquet"))
                )
                d = pa.concat_tables(
                    [pq.read_table(f, columns=["docID", value_col]) for f in dm_files]
                )
                ids = d["docID"].to_numpy(zero_copy_only=False)
                vals = d[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
                order = np.argsort(ids)
                maps.append((ids[order], vals[order]))
            cache[value_col] = maps
        return cache[value_col]

    def match_stats_many(
        self, queries: list[list[str]], value_col: str, mode: str = "or"
    ) -> list[tuple[int, int, int | None, int | None]]:
        """Per query: exact (n_docs, sum, min, max) of an integer docmap
        column over the LIVE match set — the stats-aggregation side of
        faceted search (numeric twin of ``facet_many``), pushed down so
        only four numbers per query leave each shard.  Integer sums merge
        exactly across shards (each doc lives in one chunk)."""
        maps = self._value_maps(value_col)
        out = []
        for terms in queries:
            n, s, lo, hi = 0, 0, None, None
            # per-chunk match -> same chunk's value map (correct even when
            # chunk docID ranges overlap, e.g. after merge_indexes)
            for ci, (ids, vals) in zip(self.chunks, maps):
                if mode == "or":
                    docs = _excluded_docs(ci, terms)
                else:
                    docs = _excluded_docs(ci, terms[:1])
                    for t in terms[1:]:
                        if docs.size == 0:
                            break
                        docs = np.intersect1d(
                            docs, _excluded_docs(ci, [t]), assume_unique=True
                        )
                if docs.size:
                    docs = docs[self._mask_tomb(docs)]
                if docs.size == 0:
                    continue
                v = vals[np.searchsorted(ids, docs)]
                n += int(docs.size)
                s += int(v.sum())
                lo = int(v.min()) if lo is None else min(lo, int(v.min()))
                hi = int(v.max()) if hi is None else max(hi, int(v.max()))
            out.append((n, s, lo, hi))
        return out

    def phrase_many(
        self, phrases: list[list[str]]
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Per ordered-term phrase: (matching docIDs, phrase-start counts)."""
        out = []
        for terms in phrases:
            docs_parts, cnt_parts = [], []
            for ci in self.chunks:
                d, c = _phrase_chunk(ci, terms)
                docs_parts.append(d)
                cnt_parts.append(c)
            d = np.concatenate(docs_parts)
            c = np.concatenate(cnt_parts)
            m = self._mask_tomb(d)
            out.append((d[m], c[m]))
        return out

    def near_many(
        self, pairs: list[tuple[str, str, int] | None]
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Per (term_a, term_b, window): (matching docIDs, near-counts)."""
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        out = []
        for p in pairs:
            if p is None:
                out.append(empty)
                continue
            a, b, w = p
            docs_parts, cnt_parts = [], []
            for ci in self.chunks:
                d, c = _near_chunk(ci, a, b, w)
                docs_parts.append(d)
                cnt_parts.append(c)
            d = np.concatenate(docs_parts)
            c = np.concatenate(cnt_parts)
            m = self._mask_tomb(d)
            out.append((d[m], c[m]))
        return out


class BM25Searcher:
    """Driver-side handle: actor pool over the index's chunks."""

    def __init__(
        self,
        index_dir: str,
        num_shards: int | None = None,
        snapshot: int | None = None,
    ):
        """``snapshot=N`` reads AS OF that published version (time
        travel): the snapshot's chunk subset, its frozen N/avgdl and
        hard-linked lexicon, and only the tombstone files it recorded —
        bitwise-identical to searching the index as it stood at that
        commit (``state/snapshots.py``)."""
        self.index_dir = index_dir
        lex_dir = None
        only_tomb: list[str] | None = None
        if snapshot is None:
            self.stats = load_stats(index_dir)
            chunk_dirs = sorted(
                glob.glob(os.path.join(index_dir, "chunks", "chunk-*"))
            )
        else:
            from ..state.snapshots import load_snapshot, snapshot_lexicon_dir

            snap = load_snapshot(index_dir, snapshot)
            self.stats = snap["stats"]
            chunk_dirs = [
                os.path.join(index_dir, "chunks", f"chunk-{c['chunk']:05d}")
                for c in sorted(self.stats["chunks"], key=lambda c: c["chunk"])
            ]
            lex_dir = snapshot_lexicon_dir(index_dir, snapshot)
            only_tomb = snap.get("tombstone_files", [])
        if not chunk_dirs:
            raise FileNotFoundError(f"no chunks under {index_dir}")
        if num_shards is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_shards = max(1, min(len(chunk_dirs), cpus // 2))
        groups: list[list[str]] = [[] for _ in range(num_shards)]
        for i, d in enumerate(chunk_dirs):
            groups[i % num_shards].append(d)
        from .compact import load_tombstones

        tomb = load_tombstones(index_dir, only_files=only_tomb)
        tomb_ref = ray.put(tomb) if len(tomb) else None
        self.style_bits = (
            2 if self.stats.get("style_levels")
            else (1 if self.stats.get("style_head") else 0)
        )
        self.style = bool(self.style_bits)
        self.actors = [
            SearchShard.remote(
                g, float(self.stats["avgdl"]), tomb_ref, self.style_bits
            )
            for g in groups
            if g
        ]
        self.lexicon = Lexicon(index_dir, self.stats["N"], lex_dir=lex_dir)
        ray.get([a.ready.remote() for a in self.actors])

    def search(
        self,
        query: str,
        k: int = 10,
        prune: bool = True,
        mode: str = "or",
        meta_cols: list[str] | None = None,
        field: str | None = None,
        boost: dict[str, float] | None = None,
        style_weight: float = 1.0,
        msm: int = 2,
    ) -> pa.Table:
        return self.search_many(
            [(query, k)], prune, mode=mode, meta_cols=meta_cols, field=field,
            boost=boost, style_weight=style_weight, msm=msm,
        )[0]

    @staticmethod
    def _merge_topk(per_actor, k: int) -> pa.Table:
        """Global (score DESC, docID ASC) merge of single-query shard
        results -> the standard (rank, docID, score) page.  THE one copy
        of the tie-break: every single-query search surface (after/
        weighted/filtered/range) merges here."""
        docs = np.concatenate([r[0][0] for r in per_actor])
        scores = np.concatenate([r[0][1] for r in per_actor])
        order = np.lexsort((docs, -scores))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "docID": pa.array(docs[order], type=pa.int64()),
                "score": pa.array(scores[order], type=pa.float64()),
            }
        )

    def _prepare_or(self, query: str, field: str | None = None):
        """(present terms, idfs) for a plain OR query — absent terms drop."""
        tok_mode = self.stats.get("tokenizer", "code")
        base_terms = query_terms(query, tok_mode)
        terms = [f"{field}:{t}" for t in base_terms] if field else base_terms
        weights = self.lexicon.idf(terms)
        present = [t for t in terms if t in weights]
        return present, [weights[t][1] for t in present]

    def search_after(
        self,
        query: str,
        k: int = 10,
        after: tuple[float, int] | None = None,
        field: str | None = None,
    ) -> pa.Table:
        """Cursor pagination (Elasticsearch-style ``search_after``): the
        top-k results strictly AFTER the ``(score, docID)`` cursor in the
        global (score DESC, docID ASC) order.

        Unlike offset paging, no shard ever ships cursor-rank + k rows —
        each applies the cursor filter to its own final scores and returns
        at most k survivors, so page depth never grows the merge.  Cursor
        pages score without block-max pruning (tau would form from
        candidates at-or-before the cursor and over-prune; see
        ``_score_chunk``); pruning is score-lossless, so the cursor taken
        from a pruned page-1 ``search`` row matches by exact float64
        equality.  ``after=None`` returns page 1 (identical to ``search``).
        """
        present, idfs = self._prepare_or(query, field)
        prepared = [(present, idfs, k)]
        per_actor = ray.get(
            [
                a.score_many.remote(
                    prepared, after is None, "or", None, 1.0, 2, [after]
                )
                for a in self.actors
            ]
        )
        return self._merge_topk(per_actor, k)

    def search_range(
        self,
        query: str,
        k: int = 10,
        value_col: str = "n_chars",
        lo: int | None = None,
        hi: int | None = None,
        prune: bool = True,
    ) -> pa.Table:
        """Numeric-range filtered retrieval: BM25 top-k over documents
        whose integer docmap ``value_col`` lies in [lo, hi] (either bound
        optional) — ``search_filtered``'s numeric twin, same pushed-down
        exclusion channel, same global-statistics contract."""
        present, idfs = self._prepare_or(query)
        prepared = [(present, idfs, k)]
        per_actor = ray.get(
            [
                a.score_range_many.remote(prepared, prune, value_col, lo, hi)
                for a in self.actors
            ]
        )
        return self._merge_topk(per_actor, k)

    def search_function(
        self,
        query: str,
        k: int = 10,
        value_col: str = "n_chars",
        scale: float = 1000.0,
    ) -> pa.Table:
        """Function-score retrieval: BM25 multiplied by the per-doc prior
        ``1 + ln(1 + value/scale)`` over an integer docmap column
        (Elasticsearch ``function_score`` / ``field_value_factor``).  See
        ``SearchShard.score_function_many`` for the pruning trade-off."""
        present, idfs = self._prepare_or(query)
        prepared = [(present, idfs, k)]
        per_actor = ray.get(
            [
                a.score_function_many.remote(prepared, value_col, scale)
                for a in self.actors
            ]
        )
        return self._merge_topk(per_actor, k)

    def match_stats(
        self, queries: list[str], value_col: str = "n_chars", mode: str = "or"
    ) -> pa.Table:
        """Stats aggregation over the full match set: per query, the exact
        (n_docs, sum, min, max) of an integer docmap column across every
        live matching document — Elasticsearch's stats agg next to
        ``facet_counts``' terms agg.  Shards return four numbers each;
        integer merge on the driver is exact.  One row per query:
        (qid, n_docs, sum_val, min_val, max_val); a query with no match
        yields n_docs = 0 with NULL min/max (SQL aggregate semantics)."""
        tok_mode = self.stats.get("tokenizer", "code")
        prepared = [query_terms(q, tok_mode) for q in queries]
        per_actor = ray.get(
            [a.match_stats_many.remote(prepared, value_col, mode) for a in self.actors]
        )
        rows: dict[str, list] = {k: [] for k in ("qid", "n_docs", "sum_val", "min_val", "max_val")}
        for qi in range(len(prepared)):
            n = sum(r[qi][0] for r in per_actor)
            s = sum(r[qi][1] for r in per_actor)
            los = [r[qi][2] for r in per_actor if r[qi][2] is not None]
            his = [r[qi][3] for r in per_actor if r[qi][3] is not None]
            rows["qid"].append(qi + 1)
            rows["n_docs"].append(n)
            rows["sum_val"].append(s)
            rows["min_val"].append(min(los) if los else None)
            rows["max_val"].append(max(his) if his else None)
        return pa.table(
            {
                "qid": pa.array(rows["qid"], pa.int64()),
                "n_docs": pa.array(rows["n_docs"], pa.int64()),
                "sum_val": pa.array(rows["sum_val"], pa.int64()),
                "min_val": pa.array(rows["min_val"], pa.int64()),
                "max_val": pa.array(rows["max_val"], pa.int64()),
            }
        )

    def search_filtered(
        self,
        query: str,
        k: int = 10,
        filter_col: str = "lang",
        filter_vals: list | None = None,
        prune: bool = True,
    ) -> pa.Table:
        """Filtered retrieval: BM25 top-k over only the documents whose
        docmap ``filter_col`` value is in ``filter_vals`` (Elasticsearch
        bool-filter semantics: the predicate restricts the MATCH SET, not
        the corpus statistics — N/avgdl/idf stay global).  The predicate
        is pushed into the shard actors' exclusion channel before the
        prune threshold forms, so block-max pruning stays score-lossless
        over the allowed set."""
        present, idfs = self._prepare_or(query)
        prepared = [(present, idfs, k)]
        per_actor = ray.get(
            [
                a.score_filtered_many.remote(
                    prepared, prune, filter_col, list(filter_vals or [])
                )
                for a in self.actors
            ]
        )
        return self._merge_topk(per_actor, k)

    def search_weighted(
        self,
        weighted_terms: list[tuple[str, float]],
        k: int = 10,
        prune: bool = True,
    ) -> pa.Table:
        """OR-mode BM25 where each (term, w) entry contributes
        ``w * idf(term) * tf_saturation`` — the weighted-query primitive
        behind pseudo-relevance feedback / RM3-style expansion (and the
        generalization of ``boost=``'s namespace weighting to arbitrary
        per-term weights).  Entries are scored in list order; a term
        listed twice contributes twice (mirroring a SQL UNION ALL of
        query rows).  Absent terms contribute nothing."""
        weights = self.lexicon.idf([t for t, _ in weighted_terms])
        present, idfs = [], []
        for t, w in weighted_terms:
            if t in weights:
                present.append(t)
                idfs.append(w * weights[t][1])
        prepared = [(present, idfs, k)]
        per_actor = ray.get(
            [a.score_many.remote(prepared, prune, "or") for a in self.actors]
        )
        return self._merge_topk(per_actor, k)

    def search_many(
        self,
        queries: list[tuple[str, int]],
        prune: bool = True,
        mode: str = "or",
        meta_cols: list[str] | None = None,
        field: str | None = None,
        boost: dict[str, float] | None = None,
        exclude: list[str | None] | None = None,
        style_weight: float = 1.0,
        msm: int = 2,
    ) -> list[pa.Table]:
        """Top-k BM25 per query.

        mode="or": any query term may match (scores sum over present terms).
        mode="and": conjunctive — only docs containing EVERY query term
        (skip-seek posting intersection inside the shard actors); a term
        absent from the whole lexicon empties the result.
        mode="msm": minimum-should-match — only docs matching at least
        ``msm`` DISTINCT query terms are eligible (duplicate query terms
        are deduped first); msm=1 is OR, msm=len(terms) is AND — use those
        modes directly for their pruned/skip-seek fast paths.
        exclude: one exclusion string per query (or None) — boolean NOT:
        documents containing ANY excluded term are barred from that query's
        results (masked inside the shards before the prune threshold forms,
        so pruning stays score-lossless over the allowed set).
        meta_cols: join these docmap columns (repo/path/lang/...) onto the
        results — the reference's ``getDocument(i)`` docID -> URL lookup
        (``/root/reference/index.cpp:16-19``) as a broadcast-small-side join.
        field: scope the query to one field namespace — terms are looked up
        under their ``{field}:{term}`` marker keys (the reference's prefixed
        dictionary, ``/root/reference/index.h:320-326``); requires an index
        built with ``field_col``.
        boost: {namespace: weight} score boosts — each query term t adds
        ``weight * idf_ns(t) * tf_sat`` for its ``{ns}:{t}`` marker postings
        on top of the content score (the reference's style/weight bits,
        ``/root/reference/index.h:44-49``, as a rank-time weighting hook);
        requires an index built with ``head_tokens`` or ``field_col``.
        style_weight: on an index built with ``style_head`` a scalar >= 1 —
        postings whose style bit is set score with ``tf * style_weight``;
        on an index built with ``style_levels`` a length-4 sequence of
        per-class weights (class 0 = normal, conventionally 1.0; every
        weight >= 0) — posting of class c scores with ``tf * w[c]``.  The
        per-posting variant of the reference's style weighting (the class
        rides the wire tf slot; bits cost ~1-2 varint bits per posting
        instead of head_tokens' duplicated marker postings).  Block-max
        bounds stay sound for any weights: the skip max_tf is real tf and
        the upper bound multiplies by max(weights, 1).
        """
        sw_seq = np.ndim(style_weight) != 0
        if sw_seq or float(style_weight) != 1.0:
            if not self.style:
                raise ValueError(
                    f"index at {self.index_dir} was built without "
                    "style_head/style_levels"
                )
            if sw_seq:
                w = np.asarray(style_weight, np.float64)
                if len(w) != 1 << self.style_bits:
                    raise ValueError(
                        f"style_weight must have {1 << self.style_bits} "
                        f"entries for this index ({self.style_bits}-bit styles)"
                    )
                if (w < 0).any():
                    raise ValueError("style weights must be >= 0")
            elif float(style_weight) < 1.0:
                raise ValueError(
                    "scalar style_weight must be >= 1 (use a per-class "
                    "sequence for down-weighting)"
                )
        # "head" is a marker namespace too (head_tokens builds), scoped
        # exactly like a field_col namespace — dis_max subqueries use it
        if field and not (
            self.stats.get("field_col")
            or (field == "head" and self.stats.get("head_tokens"))
        ):
            raise ValueError(
                f"index at {self.index_dir} was built without field_col"
            )
        if mode == "msm" and (not isinstance(msm, int) or msm < 1):
            raise ValueError("msm must be a positive int")
        if boost:
            if mode in ("and", "msm"):
                raise ValueError("boost is only supported with mode='or'")
            if not (self.stats.get("head_tokens") or self.stats.get("field_col")):
                raise ValueError(
                    f"index at {self.index_dir} has no marker namespaces to boost"
                )
        if exclude is not None:
            if mode in ("and", "msm"):
                raise ValueError("exclude is only supported with mode='or'")
            if len(exclude) != len(queries):
                raise ValueError("exclude must parallel queries (use None slots)")
        tok_mode = self.stats.get("tokenizer", "code")
        exc_terms: list[list[str]] | None = None
        if exclude is not None:
            exc_terms = [
                query_terms(x, tok_mode) if x else [] for x in exclude
            ]
        prepared = []
        dead = set()  # AND queries with a term missing from the lexicon
        for qi, (q, k) in enumerate(queries):
            # query_terms returns sorted(set(...)), so terms are already
            # distinct — the msm match counter relies on this
            base_terms = query_terms(q, tok_mode)
            terms = [f"{field}:{t}" for t in base_terms] if field else base_terms
            weights = self.lexicon.idf(terms)
            present = [t for t in terms if t in weights]  # absent terms score 0
            if mode == "and" and len(present) < len(terms):
                dead.add(qi)
                present = []
            idfs = [weights[t][1] for t in present]
            if boost and qi not in dead:
                for ns, w in sorted(boost.items()):
                    bterms = [f"{ns}:{t}" for t in base_terms]
                    bw = self.lexicon.idf(bterms)
                    bpresent = [t for t in bterms if t in bw]
                    present = present + bpresent
                    idfs = idfs + [w * bw[t][1] for t in bpresent]
            prepared.append((present, idfs, k))
        futs = [
            a.score_many.remote(prepared, prune, mode, exc_terms, style_weight, msm)
            for a in self.actors
        ]
        per_actor = ray.get(futs)
        out = []
        for qi, (_, _, k) in enumerate(prepared):
            docs = np.concatenate([pa_res[qi][0] for pa_res in per_actor])
            scores = np.concatenate([pa_res[qi][1] for pa_res in per_actor])
            if qi in dead:
                docs, scores = docs[:0], scores[:0]
            order = np.lexsort((docs, -scores))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "score": pa.array(scores[order], type=pa.float64()),
                    }
                )
            )
        if meta_cols:
            out = self._join_meta(out, meta_cols)
        return out

    def search_many_f(
        self,
        queries: list[tuple[str, int]],
        w_head: float = 2.0,
        w_body: float = 1.0,
    ) -> list[pa.Table]:
        """True BM25F over the head/body field split — see
        ``_score_chunk_bm25f`` for the model (per-field length-normalized
        tf blended BEFORE k1 saturation; NOT the same ranking as
        ``boost={"head": w}``).  Requires an index built with
        ``head_tokens``; idf comes from the content namespace.  Per-field
        average lengths are exact: each shard returns its (sum min(dl,H),
        sum dl) partials once (cached), merged on the driver — the same
        integer-exact merge discipline as FederatedBM25's stats."""
        H = int(self.stats.get("head_tokens") or 0)
        if not H:
            raise ValueError(
                f"index at {self.index_dir} was built without head_tokens"
            )
        if not hasattr(self, "_flen"):
            parts = ray.get(
                [a.field_len_sums.remote(H) for a in self.actors]
            )
            sh = sum(p[0] for p in parts)
            sb = sum(p[1] for p in parts)
            n = float(self.stats["N"])
            self._flen = (sh / n if n else 0.0, (sb - sh) / n if n else 0.0)
        avg_h, avg_b = self._flen
        tok_mode = self.stats.get("tokenizer", "code")
        prepared = []
        for q, k in queries:
            terms = query_terms(q, tok_mode)
            weights = self.lexicon.idf(terms)
            present = [t for t in terms if t in weights]
            prepared.append((present, [weights[t][1] for t in present], k))
        futs = [
            a.bm25f_many.remote(prepared, H, w_head, w_body, avg_h, avg_b)
            for a in self.actors
        ]
        per_actor = ray.get(futs)
        out = []
        for qi, (_, _, k) in enumerate(prepared):
            docs = np.concatenate([r[qi][0] for r in per_actor])
            scores = np.concatenate([r[qi][1] for r in per_actor])
            order = np.lexsort((docs, -scores))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "score": pa.array(scores[order], type=pa.float64()),
                    }
                )
            )
        return out

    def search_lm_many(
        self, queries: list[tuple[str, int]], mu: float = 2000.0
    ) -> list[pa.Table]:
        """Top-k under query-likelihood Dirichlet LM ranking
        (``_score_chunk_lm`` holds the scoring contract) — the same
        shards, postings and doclens as BM25, different ranking model.
        Absent terms (cf == 0) drop, exactly like the BM25 OR path."""
        tok_mode = self.stats.get("tokenizer", "code")
        total = float(self.stats["total_tokens"])
        prepared = []
        for q, k in queries:
            terms = query_terms(q, tok_mode)
            cf = self.lexicon.cf(terms)
            present = [t for t in terms if cf.get(t, 0) > 0]
            prepared.append((present, [cf[t] for t in present], k))
        futs = [a.lm_many.remote(prepared, total, mu) for a in self.actors]
        per_actor = ray.get(futs)
        out = []
        for qi, (_, _, k) in enumerate(prepared):
            docs = np.concatenate([pa_res[qi][0] for pa_res in per_actor])
            scores = np.concatenate([pa_res[qi][1] for pa_res in per_actor])
            order = np.lexsort((docs, -scores))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "score": pa.array(scores[order], type=pa.float64()),
                    }
                )
            )
        return out

    def search_sorted_by(
        self,
        query: str,
        k: int = 10,
        value_col: str = "n_chars",
        desc: bool = True,
    ) -> pa.Table:
        """Sort-by-field retrieval: the top-k docs MATCHING the query (OR
        semantics) ordered by an integer docmap column instead of BM25 —
        (rank, docID, value).  Shards return k rows each
        (``SearchShard.sort_by_value_many``); the driver merges with the
        same (value desc/asc, docID asc) tie-break."""
        tok_mode = self.stats.get("tokenizer", "code")
        terms = query_terms(query, tok_mode)
        per_actor = ray.get(
            [
                a.sort_by_value_many.remote([terms], value_col, k, desc)
                for a in self.actors
            ]
        )
        docs = np.concatenate([r[0][0] for r in per_actor])
        vals = np.concatenate([r[0][1] for r in per_actor])
        order = np.lexsort((docs, -vals if desc else vals))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "docID": pa.array(docs[order], type=pa.int64()),
                "value": pa.array(vals[order], type=pa.int64()),
            }
        )

    def match_docs(self, query: str, mode: str = "or") -> np.ndarray:
        """Full sorted match set for a query — the index as a FILTER: feed
        the result into a predicate-pushdown scan (``find_docs``) or any
        downstream Dataset pipeline.  No scoring, no top-k cut."""
        tok_mode = self.stats.get("tokenizer", "code")
        terms = query_terms(query, tok_mode)
        if not terms:
            return np.empty(0, np.int64)
        futs = [a.match_many.remote([terms], mode) for a in self.actors]
        docs = np.concatenate([r[0] for r in ray.get(futs)])
        return np.sort(docs)

    def facet_counts(
        self, queries: list[str], facet_col: str = "lang"
    ) -> list[pa.Table]:
        """Faceted search: per query, the live-document match count per
        value of a docmap column — the aggregations-over-the-match-set
        feature (Elasticsearch-style facets / term aggregations) pushed
        down into the shard actors: each shard bincounts its own chunks'
        matches against a resident docID -> facet-code map and only the
        tiny per-facet dictionaries return to the driver.

        One (facet, n_docs) table per query, facet-ascending; a query with
        no matching document yields an empty table.
        """
        tok_mode = self.stats.get("tokenizer", "code")
        prepared = [query_terms(q, tok_mode) for q in queries]
        per_actor = ray.get(
            [a.facet_many.remote(prepared, facet_col) for a in self.actors]
        )
        out = []
        for qi in range(len(prepared)):
            agg: dict[str, int] = {}
            for pa_res in per_actor:
                for cat, n in pa_res[qi].items():
                    agg[cat] = agg.get(cat, 0) + n
            # null facet (if any) sorts last, mirroring SQL NULLS LAST
            cats = sorted(agg, key=lambda c: (c is None, c if c is not None else ""))
            out.append(
                pa.table(
                    {
                        "facet": pa.array(cats, pa.string()),
                        "n_docs": pa.array([agg[c] for c in cats], pa.int64()),
                    }
                )
            )
        return out

    def search_prefix_many(
        self,
        queries: list[tuple[str, int]],
        prune: bool = True,
        max_expand: int | None = None,
    ) -> list[pa.Table]:
        """Wildcard BM25: query tokens ending in ``*`` expand to EVERY
        lexicon term with that prefix (ascending; ``max_expand`` is an
        explicit opt-in budget that RAISES when it would truncate — a
        silent cap would quietly diverge from the exhaustive semantics),
        then score as a disjunction — each expanded term contributes with
        its own idf, exactly as if the user had typed them all.  The
        expansion is one sorted-lexicon range probe per wildcard (the same
        dictionary-ordering property the reference keeps its dict sorted
        for, ``/root/reference/index.h:320-326``)."""
        tok_mode = self.stats.get("tokenizer", "code")
        prepared = []
        for q, k in queries:
            terms: set[str] = set()
            for tok in q.split():
                if tok.endswith("*") and len(tok) > 1:
                    terms.update(
                        self.lexicon.prefix_terms(tok[:-1].lower(), max_expand)
                    )
                else:
                    terms.update(query_terms(tok, tok_mode))
            prepared.append((terms, k))
        return self._expanded_or_search(prepared, prune)

    def search_wildcard_many(
        self,
        queries: list[tuple[str, int]],
        prune: bool = True,
        max_expand: int | None = None,
    ) -> list[pa.Table]:
        """General single-``*`` wildcard BM25 (``p*``, ``*s``, ``a*b``):
        each wildcard token expands via :meth:`Lexicon.wildcard_terms`
        into an OR over every matching term (each with its own idf) —
        the suffix/infix companion of :meth:`search_prefix_many`."""
        tok_mode = self.stats.get("tokenizer", "code")
        prepared = []
        for q, k in queries:
            terms: set[str] = set()
            for tok in q.split():
                if "*" in tok:
                    terms.update(
                        self.lexicon.wildcard_terms(tok.lower(), max_expand)
                    )
                else:
                    terms.update(query_terms(tok, tok_mode))
            prepared.append((terms, k))
        return self._expanded_or_search(prepared, prune)

    def search_fuzzy_many(
        self, queries: list[tuple[str, int]], prune: bool = True
    ) -> list[pa.Table]:
        """Fuzzy BM25: each query token expands to EVERY lexicon term
        within Levenshtein distance <= 1 (SymSpell deletion-neighborhood
        probe + exact verify, ``Lexicon.fuzzy_terms``), then scores as a
        disjunction — each expanded term contributes with its own idf,
        exactly as if the user had typed them all.  An absent-but-typo'd
        term recovers its neighbors; a token with no neighbors contributes
        nothing."""
        if self.stats.get("field_col") or self.stats.get("head_tokens"):
            # marker terms ('{ns}:{t}') share the lexicon and sit within
            # distance 1 of content twins ('en:a' vs 'ena') — fuzzy
            # expansion would score namespace postings as content
            raise ValueError(
                "fuzzy search is not supported on marker-namespace indexes "
                "(built with field_col/head_tokens)"
            )
        tok_mode = self.stats.get("tokenizer", "code")
        prepared = []
        for q, k in queries:
            terms: set[str] = set()
            for tok in query_terms(q, tok_mode):
                terms.update(self.lexicon.fuzzy_terms(tok))
            prepared.append((terms, k))
        return self._expanded_or_search(prepared, prune)

    def search_dsl(self, q: str, k: int = 10, prune: bool = True) -> pa.Table:
        """One-string query surface: parse the mini DSL (``parse_dsl``)
        and compose the engine's primitives —

        - optional / required / field terms and prefix-/fuzzy-expansions
          all SCORE as a disjunction, each term with its own idf;
        - required terms additionally FILTER (doc must contain all of
          them — skip-seek AND match set from the shards);
        - excluded terms bar documents (the score-lossless NOT channel);
        - phrases FILTER via the positional index (phrase words score
          only if also present as bare terms).

        With a required/phrase inclusion filter, per-chunk top-k pruning
        is unsound (tau would form from docs the filter then removes), so
        those queries run dense chunk scans; pure disjunctions keep the
        pruned path."""
        spec = parse_dsl(q)
        tok_mode = self.stats.get("tokenizer", "code")
        if spec["fields"] and not self.stats.get("field_col"):
            raise ValueError(
                f"index at {self.index_dir} was built without field_col"
            )
        if spec["phrases"] and not self.stats.get("positions"):
            raise ValueError(
                f"index at {self.index_dir} was built without positions=True"
            )

        def analyze(tokens: list[str]) -> set[str]:
            out: set[str] = set()
            for t in tokens:
                out.update(query_terms(t, tok_mode))
            return out

        opt = analyze(spec["opt"])
        req = analyze(spec["req"])
        exc = sorted(analyze(spec["exc"]))
        expand: set[str] = set()
        for p in spec["prefix"]:
            expand.update(self.lexicon.prefix_terms(p.lower()))
        for f in spec["fuzzy"]:
            for ft in query_terms(f, tok_mode):
                expand.update(self.lexicon.fuzzy_terms(ft))
        for ns, t in spec["fields"]:
            expand.update(f"{ns}:{at}" for at in query_terms(t, tok_mode))
        scored_terms = sorted(opt | req | expand)
        weights = self.lexicon.idf(scored_terms)
        present = [t for t in scored_terms if t in weights]
        idfs = [weights[t][1] for t in present]

        incl: np.ndarray | None = None
        req_sorted = sorted(req)
        if req_sorted:
            per = ray.get(
                [a.match_many.remote([req_sorted], "and") for a in self.actors]
            )
            incl = np.concatenate([r[0] for r in per])
        for ph in spec["phrases"]:
            ph_docs = self.phrase_many([ph])[0]["docID"].to_numpy(
                zero_copy_only=False
            )
            incl = (
                ph_docs if incl is None else np.intersect1d(incl, ph_docs)
            )

        kk = k if incl is None else (1 << 31)
        prepared = [(present, idfs, kk)]
        futs = [
            a.score_many.remote(
                prepared, prune and incl is None, "or", [exc] if exc else None
            )
            for a in self.actors
        ]
        per_actor = ray.get(futs)
        docs = np.concatenate([r[0][0] for r in per_actor])
        scores = np.concatenate([r[0][1] for r in per_actor])
        if incl is not None:
            m = np.isin(docs, incl)
            docs, scores = docs[m], scores[m]
        order = np.lexsort((docs, -scores))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "docID": pa.array(docs[order], type=pa.int64()),
                "score": pa.array(scores[order], type=pa.float64()),
            }
        )

    def search_collapse_many(
        self,
        queries: list[tuple[str, int]],
        collapse_col: str,
        cap: int = 2,
    ) -> list[pa.Table]:
        """Top-k with field collapsing: at most ``cap`` results per
        distinct ``collapse_col`` value (result diversification /
        dedup-by-source — Elasticsearch's ``collapse``).  Exact: shards
        return per-group top-cap candidates (``SearchShard.collapse_many``
        combiner), the driver re-caps per group globally, then cuts the
        standard (score desc, docID asc) top-k.  Returns
        (rank, docID, score, group)."""
        tok_mode = self.stats.get("tokenizer", "code")
        prepared = []
        for q, k in queries:
            terms = query_terms(q, tok_mode)
            weights = self.lexicon.idf(terms)
            present = [t for t in terms if t in weights]
            prepared.append((present, [weights[t][1] for t in present], k))
        futs = [
            a.collapse_many.remote(prepared, collapse_col, cap)
            for a in self.actors
        ]
        per_actor = ray.get(futs)
        out = []
        for qi, (_, _, k) in enumerate(prepared):
            docs = np.concatenate([r[qi][0] for r in per_actor])
            scores = np.concatenate([r[qi][1] for r in per_actor])
            groups: list[str] = []
            for r in per_actor:
                groups.extend(r[qi][2])
            order = np.lexsort((docs, -scores))
            seen: dict[str, int] = {}
            keep = []
            for i in order:
                g = groups[i]
                c = seen.get(g, 0)
                if c < cap:
                    seen[g] = c + 1
                    keep.append(i)
                    if len(keep) == k:
                        break
            keep_arr = np.asarray(keep, dtype=np.int64)
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(keep_arr) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[keep_arr], type=pa.int64()),
                        "score": pa.array(scores[keep_arr], type=pa.float64()),
                        "group": pa.array(
                            [groups[i] for i in keep], type=pa.string()
                        ),
                    }
                )
            )
        return out

    def search_synonyms_many(
        self,
        queries: list[tuple[str, int]],
        synonyms: dict[str, list[str]],
        prune: bool = True,
    ) -> list[pa.Table]:
        """Query-time synonym expansion (the analyzer-chain synonym filter
        in disjunction form): each query term additionally contributes its
        synonyms' postings, every expanded term scored with its OWN idf —
        exactly as if the user had typed them all.  The map holds RAW
        user-level words; both its keys and values pass through the
        index's analyzer (Lucene SynonymFilter semantics), so on a
        stemming index 'connection -> socket' matches the token
        'connect' and contributes 'socket''s stem.  Synonyms absent from
        the corpus drop, like any other absent term."""
        tok_mode = self.stats.get("tokenizer", "code")
        amap: dict[str, set[str]] = {}
        for key, vals in synonyms.items():
            avals = {t for v in vals for t in query_terms(v, tok_mode)}
            for kt in query_terms(key, tok_mode):
                amap.setdefault(kt, set()).update(avals)
        prepared = []
        for q, k in queries:
            terms: set[str] = set()
            for tok in query_terms(q, tok_mode):
                terms.add(tok)
                terms.update(amap.get(tok, ()))
            prepared.append((terms, k))
        return self._expanded_or_search(prepared, prune)

    def _expanded_or_search(
        self, prepared: list[tuple[set[str], int]], prune: bool
    ) -> list[pa.Table]:
        """Shared tail of the expansion modes (wildcard, fuzzy): score the
        expanded term set as a disjunction — each term with its own idf,
        exactly as if the user had typed them all — and k-way-merge the
        per-shard results with the standard (score desc, docID asc) order."""
        ready = []
        for terms, k in prepared:
            ordered = sorted(terms)
            weights = self.lexicon.idf(ordered)
            present = [t for t in ordered if t in weights]
            idfs = [weights[t][1] for t in present]
            ready.append((present, idfs, k))
        futs = [a.score_many.remote(ready, prune, "or") for a in self.actors]
        per_actor = ray.get(futs)
        out = []
        for qi, (_, _, k) in enumerate(ready):
            docs = np.concatenate([pa_res[qi][0] for pa_res in per_actor])
            scores = np.concatenate([pa_res[qi][1] for pa_res in per_actor])
            order = np.lexsort((docs, -scores))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "score": pa.array(scores[order], type=pa.float64()),
                    }
                )
            )
        return out

    def phrase_many(self, phrases: list[str]) -> list[pa.Table]:
        """Exact-phrase match over the positional index.

        Returns one table per phrase: (docID, n_matches) for every document
        containing the phrase (terms adjacent in tokenizer space), sorted by
        docID.  Requires an index built with ``positions=True``.
        """
        if not self.stats.get("positions"):
            raise ValueError(
                f"index at {self.index_dir} was built without positions=True"
            )
        tok_mode = self.stats.get("tokenizer", "code")
        prepared: list[list[str]] = []
        for q in phrases:
            terms = query_terms_ordered(q, tok_mode)
            weights = self.lexicon.idf(sorted(set(terms)))
            if len(weights) < len(set(terms)):
                terms = []  # a term absent from the corpus: no match anywhere
            prepared.append(terms)
        futs = [a.phrase_many.remote(prepared) for a in self.actors]
        per_actor = ray.get(futs)
        out = []
        for qi in range(len(prepared)):
            docs = np.concatenate([res[qi][0] for res in per_actor])
            cnts = np.concatenate([res[qi][1] for res in per_actor])
            order = np.argsort(docs)
            out.append(
                pa.table(
                    {
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "n_matches": pa.array(cnts[order], type=pa.int64()),
                    }
                )
            )
        return out

    def near_many(self, pairs: list[tuple[str, str, int]]) -> list[pa.Table]:
        """Proximity match over the positional index.

        One table per (term_a, term_b, window): (docID, n_matches) for
        every document where the two terms occur within ``window`` token
        positions of each other; n_matches counts term_a occurrences with a
        term_b nearby.  Requires an index built with ``positions=True``.
        """
        if not self.stats.get("positions"):
            raise ValueError(
                f"index at {self.index_dir} was built without positions=True"
            )
        tok_mode = self.stats.get("tokenizer", "code")
        prepared: list[tuple[str, str, int] | None] = []
        for a, b, w in pairs:
            ta = query_terms_ordered(a, tok_mode)
            tb = query_terms_ordered(b, tok_mode)
            if len(ta) != 1 or len(tb) != 1:
                raise ValueError("near_many takes single-term operands")
            weights = self.lexicon.idf(sorted({ta[0], tb[0]}))
            prepared.append(
                (ta[0], tb[0], int(w)) if len(weights) == len({ta[0], tb[0]}) else None
            )
        futs = [a.near_many.remote(prepared) for a in self.actors]
        per_actor = ray.get(futs)
        out = []
        for qi in range(len(prepared)):
            docs = np.concatenate([res[qi][0] for res in per_actor])
            cnts = np.concatenate([res[qi][1] for res in per_actor])
            order = np.argsort(docs)
            out.append(
                pa.table(
                    {
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "n_matches": pa.array(cnts[order], type=pa.int64()),
                    }
                )
            )
        return out

    def _join_meta(self, results: list[pa.Table], meta_cols: list[str]) -> list[pa.Table]:
        """Join docmap columns onto result tables (one filtered read for
        all queries' docIDs — the small side stays on the driver)."""
        all_ids = np.unique(
            np.concatenate([t["docID"].to_numpy(zero_copy_only=False) for t in results])
        ) if results else np.empty(0, np.int64)
        dm_files = sorted(
            glob.glob(os.path.join(self.index_dir, "chunks", "*", "docmap", "*.parquet"))
        )
        dsx = pads.dataset(dm_files)
        meta = dsx.to_table(
            columns=["docID"] + list(meta_cols),
            filter=pads.field("docID").isin(all_ids.tolist()),
        )
        mids = meta["docID"].to_numpy(zero_copy_only=False)
        morder = np.argsort(mids)
        out = []
        for t in results:
            ids = t["docID"].to_numpy(zero_copy_only=False)
            pos = morder[np.searchsorted(mids[morder], ids)]
            for c in meta_cols:
                t = t.append_column(c, meta[c].take(pa.array(pos)))
            out.append(t)
        return out


class FederatedBM25:
    """Several partition indexes searched as ONE logical index.

    Partition-transparency contract: ranks AND scores are bitwise
    identical to a single index built over the union corpus.  BM25 sees
    the corpus only through (N, df, avgdl), and the federation merges
    them EXACTLY — N = Σ N_i and df(t) = Σ df_i(t) are integer sums, and
    avgdl = (Σ total_tokens_i) / N is the same exact-integer float64
    division a fused build would compute (``build.py`` stores
    ``total_tokens``, not just the rounded avgdl) — so every shard scores
    with the constants the fused index would use, and the block-max
    prune bounds stay valid under the global idf.

    This is the multi-node layout: each node owns a partition (lang,
    tenant, time range — any split), queries fan out, per-partition
    top-k merges on the driver; only O(#partitions × #terms) integers
    meet centrally.  Re-expressed single-node as one shard actor per
    partition index.
    """

    def __init__(self, index_dirs: list[str]):
        from .compact import load_tombstones

        if not index_dirs:
            raise ValueError("need at least one partition index")
        statss = [load_stats(d) for d in index_dirs]
        toks = {s.get("tokenizer", "code") for s in statss}
        if len(toks) != 1:
            raise ValueError(f"partitions disagree on tokenizer: {sorted(toks)}")
        self.tok_mode = toks.pop()
        self.n = int(sum(s["N"] for s in statss))
        total_tokens = int(sum(s["total_tokens"] for s in statss))
        self.avgdl = (total_tokens / self.n) if self.n else 0.0
        # Style postings change the WIRE FORMAT ((tf << bits) | class);
        # scoring a style-built partition with style_bits=0 would read the
        # packed slot as tf, inflating every tf 2-4x.  Mirror the
        # tokenizer-agreement check: all partitions must agree, and the
        # common width propagates to every shard.
        bitss = {
            2 if s.get("style_levels") else (1 if s.get("style_head") else 0)
            for s in statss
        }
        if len(bitss) != 1:
            raise ValueError(
                f"partitions disagree on style wire format ({sorted(bitss)}-bit)"
            )
        self.style_bits = bitss.pop()
        self.lexicons = [Lexicon(d, s["N"]) for d, s in zip(index_dirs, statss)]
        self.actors = []
        for d in index_dirs:
            chunk_dirs = sorted(glob.glob(os.path.join(d, "chunks", "chunk-*")))
            if not chunk_dirs:
                raise FileNotFoundError(f"no chunks under {d}")
            tomb = load_tombstones(d)
            tomb_ref = ray.put(tomb) if len(tomb) else None
            self.actors.append(
                SearchShard.remote(
                    chunk_dirs, float(self.avgdl), tomb_ref, self.style_bits
                )
            )
        ray.get([a.ready.remote() for a in self.actors])

    def _idf(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        df: dict[str, int] = {}
        for lex in self.lexicons:
            for t, (d, _local_idf) in lex.idf(terms).items():
                df[t] = df.get(t, 0) + d
        return {
            t: (d, math.log((self.n - d + 0.5) / (d + 0.5) + 1.0))
            for t, d in df.items()
        }

    def search_many(
        self, queries: list[tuple[str, int]], prune: bool = True
    ) -> list[pa.Table]:
        prepared = []
        for q, k in queries:
            terms = query_terms(q, self.tok_mode)
            w = self._idf(terms)
            present = [t for t in terms if t in w]
            prepared.append((present, [w[t][1] for t in present], k))
        futs = [
            a.score_many.remote(prepared, prune, "or", None, 1.0, 2)
            for a in self.actors
        ]
        per_actor = ray.get(futs)
        out = []
        for qi, (_, _, k) in enumerate(prepared):
            docs = np.concatenate([r[qi][0] for r in per_actor])
            scores = np.concatenate([r[qi][1] for r in per_actor])
            order = np.lexsort((docs, -scores))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "score": pa.array(scores[order], type=pa.float64()),
                    }
                )
            )
        return out


class RoutedBM25:
    """Elasticsearch-style CUSTOM ROUTING: documents are partitioned by a
    routing key at index time (one self-contained index per key), and a
    query carrying the key probes exactly ONE partition — no fan-out.

    Scoring is per-partition by design: each route's index carries its
    own (N, df, avgdl), so results equal a standalone index built over
    just that partition's corpus (the tenant/language-scoped semantics).
    This is the complement of :class:`FederatedBM25`, which fans out to
    every partition and merges statistics for partition-TRANSPARENT
    global search.  The cluster story: routing turns a 256-node broadcast
    into a single node-group probe for key-scoped queries (tenant, lang,
    repo), so query throughput scales with partitions instead of being
    bounded by the slowest global fan-out.

    Searchers open lazily and are cached per route key.
    """

    def __init__(self, routes: dict[str, str]):
        if not routes:
            raise ValueError("need at least one route -> index_dir")
        self.routes = dict(routes)
        self._searchers: dict[str, BM25Searcher] = {}

    def searcher(self, key: str) -> "BM25Searcher":
        if key not in self.routes:
            raise KeyError(
                f"no route {key!r} (known: {sorted(self.routes)})"
            )
        if key not in self._searchers:
            self._searchers[key] = BM25Searcher(self.routes[key])
        return self._searchers[key]

    def search(self, key: str, q: str, k: int = 10) -> pa.Table:
        return self.searcher(key).search(q, k=k)


def term_vectors(index_dir: str, doc_ids: list) -> pa.Table:
    """Stored TERM VECTORS (the forward index): (docID, term, tf) rows for
    the requested documents, from the ``tvec/`` sidecars a
    ``BuildConfig(term_vectors=True)`` build wrote in the same tokenize
    pass as the postings (Lucene's per-doc stored term vectors — the
    inverted shards alone cannot answer doc -> terms without a full
    lexicon scan).

    Predicate-pushdown scan, same shape as :func:`find_docs`: parquet
    statistics prune to the row groups containing the requested docIDs —
    at cluster scale the tvec sidecars are docID-range partitioned with
    the chunks, so the probe touches one chunk's files."""
    import pyarrow.dataset as pads

    tv_files = sorted(
        glob.glob(os.path.join(index_dir, "chunks", "*", "tvec", "*.parquet"))
    )
    if not tv_files:
        raise FileNotFoundError(
            f"no tvec sidecars under {index_dir} — build with "
            "BuildConfig(term_vectors=True)"
        )
    dsx = pads.dataset(tv_files)
    t = dsx.to_table(filter=pads.field("docID").isin(list(doc_ids)))
    # tombstoned docs are dead for EVERY read surface, the forward index
    # included — without this a deleted doc's term vectors would survive
    # until the next purging compaction
    from .compact import load_tombstones

    tomb = load_tombstones(index_dir)
    if len(tomb):
        import pyarrow.compute as pc

        t = t.filter(
            pc.invert(pc.is_in(t["docID"], value_set=pa.array(tomb, pa.int64())))
        )
    return t


class NRTSearcher:
    """Near-real-time search (the Lucene NRT-reader semantics): an
    in-memory REALTIME SEGMENT buffers newly added documents and is
    searchable immediately — no chunk build, no flush — while the durable
    index serves everything already committed.

    Exactness contract (pinned in pytest): results are rank- AND
    score-identical to a from-scratch index over (durable + buffered)
    docs.  BM25 sees the corpus only through (N, df, avgdl); the merge is
    exact — N and df are integer sums, avgdl = (total_tokens_disk +
    total_tokens_buf) / N is the same float64 division a fused build
    computes — and the disk shards score under the merged avgdl via the
    ``score_many(avgdl=...)`` override (block-max pruning stays sound:
    tau forms from scores under the same override).

    Cluster shape: the buffer is one writer actor's working set (small by
    definition — it flushes at chunk granularity via ``flush()`` ->
    ``append_index``); at platform scale each ingest node owns one, and
    queries fan out to disk shards + the buffer exactly like
    ``FederatedBM25`` partitions.
    """

    def __init__(self, index_dir: str, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.index_dir = index_dir
        self.searcher = BM25Searcher(index_dir)
        self.text_col = text_col
        self.id_col = id_col
        self.tok_mode = self.searcher.stats.get("tokenizer", "code")
        self._norm = None
        # buffered segment state (docID-aligned arrays + term -> postings)
        self._ids: list[int] = []
        self._dl: list[int] = []
        self._post: dict[str, list[tuple[int, int]]] = {}
        self._buf_tables: list[pa.Table] = []
        self._buf_tokens = 0

    def add(self, table: pa.Table) -> None:
        """Buffer NEW documents (searchable immediately).  INSERT-ONLY:
        a doc_id may enter the buffer once — re-adding a buffered id
        raises (it would double-count the doc in the merged N/df/avgdl
        and could return the same docID twice in one result list).  To
        UPDATE a document that is already durable, tombstone it first
        (``delete_docs``) and then ``add`` the new version."""
        from ..functions.tokenize import TokenNormalizer, tokenize_batch

        if self._norm is None:
            self._norm = TokenNormalizer(self.tok_mode)
        incoming = table[self.id_col].to_numpy(zero_copy_only=False)
        if len(np.unique(incoming)) != len(incoming):
            raise ValueError("duplicate doc_ids within one add() batch")
        if self._ids and np.isin(incoming, np.asarray(self._ids)).any():
            raise ValueError(
                "doc_id already buffered; NRT add() is insert-only — "
                "delete_docs the old version first to update"
            )
        self._buf_tables.append(table)
        docc, tidocc, vocab = tokenize_batch(table[self.text_col], self._norm)
        ids = table[self.id_col].to_numpy(zero_copy_only=False)
        base = len(self._ids)
        n_tok = np.bincount(docc, minlength=table.num_rows)
        self._ids.extend(int(i) for i in ids)
        self._dl.extend(int(x) for x in n_tok)
        self._buf_tokens += int(n_tok.sum())
        if len(docc):
            key = docc.astype(np.int64) * np.int64(len(vocab) or 1) + tidocc
            order = np.argsort(key, kind="stable")
            k_s = key[order]
            starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
            tfs = np.diff(np.append(starts, len(k_s)))
            uk = k_s[starts]
            d_loc = (uk // np.int64(len(vocab) or 1)).astype(np.int64)
            t_loc = (uk % np.int64(len(vocab) or 1)).astype(np.int64)
            for dl_, tl_, tf_ in zip(d_loc, t_loc, tfs):
                self._post.setdefault(vocab[int(tl_)], []).append(
                    (base + int(dl_), int(tf_))
                )

    @property
    def buffered_docs(self) -> int:
        return len(self._ids)

    def _merged_stats(self, terms: list[str]):
        n = int(self.searcher.stats["N"]) + len(self._ids)
        total = int(self.searcher.stats["total_tokens"]) + self._buf_tokens
        avgdl = (total / n) if n else 0.0
        disk = self.searcher.lexicon.idf(terms)
        w = {}
        for t in terms:
            df = (disk[t][0] if t in disk else 0) + len(self._post.get(t, []))
            if df:
                w[t] = (df, math.log((n - df + 0.5) / (df + 0.5) + 1.0))
        return n, avgdl, w

    def _score_buffer(
        self, terms: list[str], idfs: list[float], k: int, avgdl: float
    ) -> tuple[np.ndarray, np.ndarray]:
        nb = len(self._ids)
        if nb == 0 or not terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        dl = np.asarray(self._dl, dtype=np.float64)
        norm_dl = K1 * (1.0 - B + B * dl / avgdl)
        scores = np.zeros(nb, dtype=np.float64)
        for term, idf in zip(terms, idfs):
            posts = self._post.get(term)
            if not posts:
                continue
            idx = np.fromiter((p[0] for p in posts), np.int64, len(posts))
            tfe = np.fromiter((p[1] for p in posts), np.float64, len(posts))
            scores[idx] += idf * (tfe * (K1 + 1.0)) / (tfe + norm_dl[idx])
        nz = np.flatnonzero(scores)
        if len(nz) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.asarray(self._ids, dtype=np.int64)
        order = np.lexsort((ids[nz], -scores[nz]))[:k]
        top = nz[order]
        return ids[top], scores[top]

    def search_many(
        self, queries: list[tuple[str, int]], prune: bool = True
    ) -> list[pa.Table]:
        prepared = []
        for q, k in queries:
            terms = query_terms(q, self.tok_mode)
            _, avgdl, w = self._merged_stats(terms)
            present = [t for t in terms if t in w]
            prepared.append((present, [w[t][1] for t in present], k, avgdl))
        # one avgdl per call is enough: it's corpus-level, not per-query
        avgdl = prepared[0][3] if prepared else 0.0
        shard_q = [(t, i, k) for t, i, k, _ in prepared]
        futs = [
            a.score_many.remote(shard_q, prune, "or", None, 1.0, 2, None, avgdl)
            for a in self.searcher.actors
        ]
        per_actor = ray.get(futs)
        out = []
        for qi, (terms, idfs, k, _) in enumerate(prepared):
            bd, bs = self._score_buffer(terms, idfs, k, avgdl)
            docs = np.concatenate([r[qi][0] for r in per_actor] + [bd])
            scores = np.concatenate([r[qi][1] for r in per_actor] + [bs])
            order = np.lexsort((docs, -scores))[:k]
            out.append(
                pa.table(
                    {
                        "rank": pa.array(
                            np.arange(1, len(order) + 1, dtype=np.int64)
                        ),
                        "docID": pa.array(docs[order], type=pa.int64()),
                        "score": pa.array(scores[order], type=pa.float64()),
                    }
                )
            )
        return out

    def search(self, q: str, k: int = 10) -> pa.Table:
        return self.search_many([(q, k)])[0]

    def flush(self, cfg=None) -> None:
        """Durably commit the buffer (``append_index``) and clear it; the
        next search serves everything from the disk shards."""
        if not self._buf_tables:
            return
        import tempfile

        from .build import BuildConfig, append_index

        t = pa.concat_tables(self._buf_tables)
        d = tempfile.mkdtemp(prefix="nrt_flush_")
        pq.write_table(t, os.path.join(d, "buffer.parquet"))
        cfg = cfg or BuildConfig(
            tokenizer=self.tok_mode, text_col=self.text_col,
            id_col=self.id_col, chunk_docs=250_000, num_parts=8,
            batch_size=512, salt_docs=4096,
        )
        append_index(os.path.join(d, "buffer.parquet"), self.index_dir, cfg)
        self.__init__(self.index_dir, self.text_col, self.id_col)


class QueryCache:
    """LRU query-result cache over a :class:`BM25Searcher`, INVALIDATED BY
    STATE (the Lucene rule: a cache is valid per-reader, never across
    commits): every lookup keys on the index's current commit identity —
    the sha256 of ``stats.json`` plus the sorted tombstone file list — so
    an append, delete, compaction or rollback changes the key space and a
    stale page can never be served.  The identity probe is two tiny
    filesystem reads per call; hits skip the shard fan-out entirely.
    """

    def __init__(self, searcher: "BM25Searcher", capacity: int = 256):
        from collections import OrderedDict

        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.searcher = searcher
        self.capacity = capacity
        self._lru: "OrderedDict[tuple, pa.Table]" = OrderedDict()
        # (path, size, mtime_ns) -> content sha256 — tombstone files are
        # immutable once written, so a stat-identical file never re-reads
        self._tomb_hash_memo: dict[tuple, str] = {}
        self.hits = 0
        self.misses = 0

    def _state_key(self) -> str:
        import hashlib

        d = self.searcher.index_dir
        with open(os.path.join(d, "stats.json"), "rb") as f:
            h = hashlib.sha256(f.read())
        # hash tombstone CONTENTS, not just basenames: delete_docs names
        # files sequentially (tomb-00000...), so after a rollback a later
        # delete of a DIFFERENT doc set with equal cardinality reproduces
        # the same filename and identical stats.json — basenames alone
        # would collide two distinct index states.  Content hashes are
        # memoized per (path, size, mtime_ns): the files are immutable
        # once written, so a long delete history costs one stat per file
        # per lookup, not a re-read of every tombstone on the hot path.
        seen: dict[tuple, str] = {}
        for t in sorted(
            glob.glob(os.path.join(d, "tombstones", "*.parquet"))
        ):
            st = os.stat(t)
            memo_key = (t, st.st_size, st.st_mtime_ns)
            ch = self._tomb_hash_memo.get(memo_key)
            if ch is None:
                with open(t, "rb") as f:
                    ch = hashlib.sha256(f.read()).hexdigest()
            seen[memo_key] = ch
            h.update(os.path.basename(t).encode())
            h.update(ch.encode())
        # keep only keys seen in THIS glob: tombstones removed by rollback
        # or purging compaction would otherwise leave dead entries and a
        # long-lived process cycling deletes/rollbacks grows the memo
        # without bound
        self._tomb_hash_memo = seen
        return h.hexdigest()

    def search(self, query: str, k: int = 10, mode: str = "or") -> pa.Table:
        key = (self._state_key(), query, k, mode)
        hit = self._lru.get(key)
        if hit is not None:
            self._lru.move_to_end(key)
            self.hits += 1
            return hit
        self.misses += 1
        r = self.searcher.search(query, k=k, mode=mode)
        self._lru[key] = r
        if len(self._lru) > self.capacity:
            self._lru.popitem(last=False)
        return r
