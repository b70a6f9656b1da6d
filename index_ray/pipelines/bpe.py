"""Distributed byte-pair-encoding (BPE) vocabulary training.

The op a training-data pipeline runs once per tokenizer refresh: learn the
top-N merge rules from the corpus.  Two-phase, the shape every production
BPE trainer uses (Sennrich et al. 2016; HuggingFace tokenizers):

1. **Corpus -> word-frequency table.**  ``map_batches`` partial Counters
   over the BPE pre-tokenizer regex (compiled once per worker), then one
   task-based bucket shuffle (``util.hash_groupby``) sums them.  This is
   the reduction that makes BPE tractable at 100 TB: every later pass
   costs O(distinct pre-tokens), not O(corpus tokens).

2. **Merge loop over word shards.**  The word table scatters once across a
   pool of ``_BpeShard`` actors and never moves again.  Each round every
   shard returns its partial pair-count table (adjacent symbol pairs
   weighted by word frequency, counted only over words the LAST merge
   touched after round 0 — the standard delta optimization), the partials
   fold remotely in a tree, the driver takes the global argmax pair with a
   total deterministic order (count desc, then (left, right) lexicographic
   — no hash/iteration order anywhere), broadcasts the winner, and every
   shard applies the merge in place.  Per round the driver sees one small
   folded table and ships one (left, right) pair; the shards do all the
   scanning in parallel.

Not SQL-expressible (each merge depends on the previous argmax), so the
driver row is rows-only; exactness is pinned in pytest against an
independent pure-Python reference and a shard-count-invariance check.

Reference scope note: the reference engine has no tokenizer training
(its tokenizer is rule-based, ``/root/reference/index.cpp``); this module
is part of the LLM-pipeline suite layered on the same corpus surface.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..util import hash_groupby, stage_fn
from .text import docs_dataset
from .textstats import BPE_PATTERN


class _WordPartials:
    """batch -> (word, count) partial table; regex compiled once/worker."""

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.pat = re.compile(BPE_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[self.text_col].to_pylist():
            c.update(self.pat.findall(t))
        words = sorted(c)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "count": pa.array([c[w] for w in words], pa.int64()),
            }
        )


def _sum_words(t: pa.Table) -> pa.Table:
    g = t.group_by("word").aggregate([("count", "sum")])
    return g.rename_columns(["word", "count"])


def word_frequencies(sf_dir: str, text_col: str = "text") -> ray.data.Dataset:
    """Global (word, count) over the documents table — phase-1 reduction."""
    parts = docs_dataset(sf_dir, [text_col]).map_batches(
        stage_fn(_WordPartials, text_col), batch_format="pyarrow", batch_size=512
    )
    return hash_groupby(parts, ["word"], _sum_words)


@ray.remote
class _BpeShard:
    """One shard of the word-frequency table, held as mutable symbol lists.

    ``pair_counts`` and ``apply`` both scan only ``self.active`` — after
    round 0 that is the set of words the last merge changed, so rounds get
    cheaper as merges specialize.  Counts are exact: a word's pairs are
    recounted from scratch whenever it is touched (its old contribution is
    subtracted), so the running Counter always equals a full recount.
    """

    def __init__(self, *tables: pa.Table):
        self.words: list[list[str]] = []
        self.counts: list[int] = []
        for t in tables:
            for w, n in zip(t["word"].to_pylist(), t["count"].to_pylist()):
                if len(w) >= 2:  # 1-char words never form a pair
                    self.words.append(list(w))
                    self.counts.append(int(n))
        self.pairs: Counter = Counter()
        for sym, n in zip(self.words, self.counts):
            for a, b in zip(sym, sym[1:]):
                self.pairs[(a, b)] += n
        # pair -> word indexes that currently contain it (so apply() never
        # scans the whole shard); sets stay small because merged symbols
        # are increasingly rare
        self.where: dict[tuple, set] = {}
        for i, sym in enumerate(self.words):
            for p in zip(sym, sym[1:]):
                self.where.setdefault(p, set()).add(i)

    def pair_counts(self) -> pa.Table:
        items = [(a, b, n) for (a, b), n in self.pairs.items() if n > 0]
        items.sort()
        return pa.table(
            {
                "left": pa.array([a for a, _, _ in items], pa.string()),
                "right": pa.array([b for _, b, _ in items], pa.string()),
                "count": pa.array([n for _, _, n in items], pa.int64()),
            }
        )

    def apply(self, left: str, right: str) -> int:
        """Merge every (left, right) adjacency into one symbol; returns the
        number of words touched (driver sanity signal)."""
        new = left + right
        touched = self.where.pop((left, right), set())
        for i in sorted(touched):
            sym, n = self.words[i], self.counts[i]
            for a, b in zip(sym, sym[1:]):  # retract old contribution
                self.pairs[(a, b)] -= n
                s = self.where.get((a, b))
                if s is not None:
                    s.discard(i)
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == left and sym[j + 1] == right:
                    out.append(new)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            self.words[i] = out
            for a, b in zip(out, out[1:]):  # add new contribution
                self.pairs[(a, b)] += n
                self.where.setdefault((a, b), set()).add(i)
        return len(touched)


@ray.remote
def _fold_pairs(*tables: pa.Table) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:  # every shard drained its pair mass: propagate the empty
        return tables[0]
    t = pa.concat_tables(live)
    g = t.group_by(["left", "right"]).aggregate([("count", "sum")])
    return g.rename_columns(["left", "right", "count"])


def bpe_train(
    sf_dir: str,
    n_merges: int = 24,
    min_count: int = 2,
    text_col: str = "text",
    num_shards: int | None = None,
) -> pa.Table:
    """Learn ``n_merges`` BPE merge rules -> (rank, left, right, count).

    ``count`` is the global pair frequency at merge time.  Stops early when
    the best pair drops below ``min_count``.  Deterministic for any
    ``num_shards`` (integer counts; total argmax order).
    """
    wf = word_frequencies(sf_dir, text_col)
    blocks = [
        bref
        for bundle in wf.iter_internal_ref_bundles()
        for bref in bundle.block_refs
    ]
    if num_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_shards = max(1, min(len(blocks), cpus // 2))
    groups: list[list] = [[] for _ in range(num_shards)]
    for i, b in enumerate(blocks):
        groups[i % num_shards].append(b)
    shards = [_BpeShard.remote(*g) for g in groups if g]

    ranks: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        parts = [s.pair_counts.remote() for s in shards]
        # tree fold: pairwise remote merges until one table remains
        while len(parts) > 1:
            parts = [
                _fold_pairs.remote(*parts[i : i + 4])
                for i in range(0, len(parts), 4)
            ]
        folded = ray.get(parts[0]) if parts else pa.table(
            {"left": pa.array([], pa.string()),
             "right": pa.array([], pa.string()),
             "count": pa.array([], pa.int64())}
        )
        if folded.num_rows == 0:
            break
        best = int(pc.max(folded["count"]).as_py())
        if best < min_count:
            break
        # deterministic argmax: among max-count rows, smallest (left, right)
        at = folded.filter(pc.equal(folded["count"], best))
        lr = sorted(zip(at["left"].to_pylist(), at["right"].to_pylist()))
        left, right = lr[0]
        ranks.append((r, left, right, best))
        ray.get([s.apply.remote(left, right) for s in shards])
    return pa.table(
        {
            "rank": pa.array([r for r, _, _, _ in ranks], pa.int64()),
            "left": pa.array([l for _, l, _, _ in ranks], pa.string()),
            "right": pa.array([x for _, _, x, _ in ranks], pa.string()),
            "count": pa.array([n for _, _, _, n in ranks], pa.int64()),
        }
    )


# ------------------------------------------------------ consistency row ----


def _reference_bpe(word_counts, n_merges: int, min_count: int = 2):
    """Independent full-rescan BPE (no delta optimization, no shards, no
    Arrow) used only by :func:`bpe_consistency` — a second implementation
    of the spec, deliberately sharing no code with the distributed path."""
    syms = [(list(w), int(n)) for w, n in word_counts.items() if len(w) >= 2]
    merges = []
    for r in range(n_merges):
        counts: Counter = Counter()
        for sym, n in syms:
            for p in zip(sym, sym[1:]):
                counts[p] += n
        if not counts:
            break
        best = max(counts.values())
        if best < min_count:
            break
        left, right = min(p for p, n in counts.items() if n == best)
        merges.append((r, left, right, best))
        for i, (sym, n) in enumerate(syms):
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == left and sym[j + 1] == right:
                    out.append(left + right)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            syms[i] = (out, n)
    return merges


def bpe_consistency(sf_dir: str, n_merges: int = 24) -> pa.Table:
    """Recompute-and-count check for ``bpe_train`` (constant oracle like
    the *_consistency family): the distributed shard-actor trainer and an
    independent single-process full-rescan implementation must produce the
    IDENTICAL merge table — same ranks, same (left, right) pairs, same
    counts.  One row: (n_rank_mismatches, n_count_mismatches), both 0.

    The reference pass reads the documents table directly and runs on the
    driver — this op is the verification harness, not the scale path (the
    scale path is ``bpe_train`` itself)."""
    import re

    import pyarrow.parquet as pq

    engine = bpe_train(sf_dir, n_merges=n_merges)
    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    pat = re.compile(BPE_PATTERN)
    wc: Counter = Counter()
    for t in texts:
        wc.update(pat.findall(t))
    ref = _reference_bpe(wc, n_merges)
    eng = list(
        zip(
            engine["rank"].to_pylist(),
            engine["left"].to_pylist(),
            engine["right"].to_pylist(),
            engine["count"].to_pylist(),
        )
    )
    n_rank = sum(
        1
        for (er, el, eri, _), (rr, rl, rri, _) in zip(eng, ref)
        if (er, el, eri) != (rr, rl, rri)
    ) + abs(len(eng) - len(ref))
    n_count = sum(1 for e, r in zip(eng, ref) if e[3] != r[3])
    return pa.table(
        {
            "n_rank_mismatches": pa.array([n_rank], pa.int64()),
            "n_count_mismatches": pa.array([n_count], pa.int64()),
        }
    )


# ---------------------------------------------------------------- encoding


def _merge_word(
    word: str,
    rank_of: dict[tuple[str, str], int],
    pair_of: dict[int, tuple[str, str]],
) -> list[str]:
    """Standard BPE encode of one pre-token: repeatedly merge ALL
    occurrences of the lowest-rank pair present (the exact inverse of the
    trainer's ``apply``, which also rewrites every occurrence per rank)."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        left, right = pair_of[best]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class _EncodeStage:
    """Stateful actor-pool stage: the (tiny) broadcast merge table is
    turned into a rank dict ONCE per actor; per-doc pre-tokens are encoded
    through a word->symbols memo (Zipf makes the memo hit rate high)."""

    def __init__(self, merges_ref, text_col: str = "text"):
        import re

        merges = ray.get(merges_ref)
        self.rank_of = {
            (l, r): k
            for k, l, r in zip(
                merges["rank"].to_pylist(),
                merges["left"].to_pylist(),
                merges["right"].to_pylist(),
            )
        }
        self.pair_of = {r: p for p, r in self.rank_of.items()}
        self.pat = re.compile(BPE_PATTERN)
        self.memo: dict[str, list[str]] = {}
        self.text_col = text_col

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in self.pat.findall(text):
            syms = self.memo.get(w)
            if syms is None:
                syms = _merge_word(w, self.rank_of, self.pair_of)
                self.memo[w] = syms
            out.extend(syms)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        n_ids, shas = [], []
        for t in batch[self.text_col].to_pylist():
            syms = self.encode(t or "")
            n_ids.append(len(syms))
            shas.append(
                hashlib.sha256("\x00".join(syms).encode()).hexdigest()[:16]
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ids": pa.array(n_ids, pa.int64()),
                "ids_sha": pa.array(shas, pa.string()),
            }
        )


def bpe_encode(sf_dir: str, n_merges: int = 24) -> ray.data.Dataset:
    """Apply the trained merge rules to every document: (doc_id, n_ids,
    ids_sha) where ids_sha fingerprints the exact symbol sequence.  The
    merge table is broadcast once (``ray.put``); encoding is a stateful
    actor-pool map over the corpus — the tokenize-for-training shape at
    100 TB (train once, broadcast, encode everywhere)."""
    merges = bpe_train(sf_dir, n_merges=n_merges)
    ref = ray.put(merges)
    return docs_dataset(sf_dir, ["doc_id", "text"]).map_batches(
        _EncodeStage,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 8),
    )


def bpe_encode_consistency(sf_dir: str, n_merges: int = 24) -> pa.Table:
    """Recompute-and-count check for ``bpe_encode`` (constant oracle like
    ``bpe_consistency``): the distributed actor-pool encoder and an
    independent driver-side re-encode (fresh merge dict, fresh memo) must
    agree on EVERY document's (n_ids, ids_sha).  One row:
    (n_docs, n_mismatches) — the oracle pins n_docs to the table and the
    mismatch count to zero.  NOTE the SQL side cannot re-derive the merge
    sequence (iterative argmax); the discriminating equality lives here
    and in the pytest planted-merge cases."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    eng = bpe_encode(sf_dir, n_merges=n_merges).to_pandas().set_index("doc_id")
    merges = bpe_train(sf_dir, n_merges=n_merges)
    rank_of = {
        (l, r): k
        for k, l, r in zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    }
    pair_of = {r: p for p, r in rank_of.items()}
    pat = re.compile(BPE_PATTERN)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bad = 0
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        syms: list[str] = []
        for w in pat.findall(text or ""):
            syms.extend(_merge_word(w, rank_of, pair_of))
        sha = hashlib.sha256("\x00".join(syms).encode()).hexdigest()[:16]
        row = eng.loc[did]
        if int(row["n_ids"]) != len(syms) or row["ids_sha"] != sha:
            bad += 1
    return pa.table(
        {
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "n_mismatches": pa.array([bad], pa.int64()),
        }
    )
