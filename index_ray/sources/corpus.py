"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema fixed by BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Properties the generator guarantees (all seeded, no external data):

- zipf-ish skew of files-per-repo;
- per-``lang`` keyword pools + snake/camel identifiers + literals +
  English comment words (exercises the Porter stemmer);
- >= 5 hot terms (``def return int i the``) present in > 60% of docs, to
  force the salted-groupby path;
- planted exact-duplicate pairs (every ``DUP_EVERY``-th doc) and
  near-duplicate pairs (>= 0.9 token overlap, every ``NEAR_EVERY``-th doc)
  for the dedup oracles;
- a few Unicode docs (accents + CJK) to exercise NFKD/casefold.

Determinism is *chunk-based*: content of docs [c*CHUNK, (c+1)*CHUNK) depends
only on ``(seed, c)`` and the master lang/repo draws — so generation
composes over CHUNK-aligned ranges and ``write_corpus_ray`` fans ranges out
as Ray tasks for bench-scale corpora.  Dup/near-dup planting never crosses
a chunk boundary.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 64

LANGS = ["python", "c", "cpp", "java", "js", "go", "rs", "md"]
_LANG_W = np.array([0.30, 0.10, 0.12, 0.12, 0.14, 0.08, 0.06, 0.08])

_KEYWORDS = {
    "python": ["def", "return", "class", "import", "for", "i", "in", "if",
               "else", "self", "None", "the"],
    "c": ["int", "return", "void", "char", "for", "i", "if", "else",
          "struct", "static", "the"],
    "cpp": ["int", "return", "void", "class", "for", "i", "if", "else",
            "template", "namespace", "the"],
    "java": ["int", "return", "void", "class", "for", "i", "if", "else",
             "public", "static", "the"],
    "js": ["function", "return", "const", "let", "for", "i", "if", "else",
           "var", "def", "the"],
    "go": ["func", "return", "int", "for", "i", "if", "else", "range",
           "def", "type", "the"],
    "rs": ["fn", "return", "let", "for", "i", "if", "else", "match",
           "impl", "int", "the"],
    "md": ["the", "a", "of", "to", "and", "in", "def", "return", "int", "i"],
}

_ENGLISH = [
    "parse", "parsing", "parser", "http", "request", "requests", "response",
    "binary", "search", "searching", "tree", "trees", "insert", "inserted",
    "insertion", "node", "nodes", "tokenizer", "token", "tokens",
    "normalization", "normalize", "unicode", "string", "value", "values",
    "connection", "connections", "connected", "running", "files", "file",
    "buffer", "stream", "read", "write", "writing", "index", "indexes",
    "document", "documents", "hash", "table", "list", "sorted", "sorting",
    "merge", "merged", "compress", "compression", "encode", "decoded",
    "query", "queries", "score", "scoring", "rank", "ranking", "count",
    "counting", "batch", "batches", "shuffle", "partition", "partitions",
    "worker", "workers", "cluster", "memory", "cache", "cached", "error",
    "errors", "result", "results", "test", "testing", "helper", "utility",
]

_IDENT_PARTS = [
    "get", "set", "make", "build", "load", "save", "init", "run", "calc",
    "proc", "data", "item", "user", "node", "tree", "list", "map", "key",
    "val", "buf", "ctx", "cfg", "tmp", "out", "src", "dst", "idx", "ptr",
]

_UNICODE_WORDS = ["café", "naïve", "école", "übung", "señor", "日本語", "中文", "résumé"]

_EXTS = {"python": "py", "c": "c", "cpp": "cc", "java": "java", "js": "js",
         "go": "go", "rs": "rs", "md": "md"}

_PUNCT = ["(", ")", "{", "}", "[", "]", ";", ",", "=", "+", "->", "==", ":"]

DUP_EVERY = 50       # doc i with i % DUP_EVERY == 1 duplicates doc i-1 exactly
NEAR_EVERY = 20      # doc i with i % NEAR_EVERY == 3 near-duplicates doc i-1
UNICODE_EVERY = 37

_POOL_CACHE: dict[str, tuple] = {}


def _pools(lang: str):
    hit = _POOL_CACHE.get(lang)
    if hit is None:
        snake = np.array([f"{a}_{b}" for a in _IDENT_PARTS for b in _IDENT_PARTS])
        camel = np.array([a + b.capitalize() for a in _IDENT_PARTS for b in _IDENT_PARTS])
        hit = (np.array(_KEYWORDS[lang]), np.array(_ENGLISH), snake, camel,
               np.array(_PUNCT + (["#"] if lang in ("python", "md") else ["//"])))
        _POOL_CACHE[lang] = hit
    return hit


def _gen_tokens_flat(rng: np.random.Generator, lang: str, total: int) -> np.ndarray:
    """One vectorized draw of ``total`` tokens for one language."""
    kw, eng, snake, camel, punct = _pools(lang)
    r = rng.random(total)
    kws = kw[rng.integers(0, len(kw), total)]
    engs = eng[rng.integers(0, len(eng), total)]
    combo = rng.integers(0, len(snake), total)
    idents = np.where(rng.random(total) < 0.5, snake[combo], camel[combo])
    nums = rng.integers(0, 10000, total).astype("U6")
    puncts = punct[rng.integers(0, len(punct), total)]
    return np.where(
        r < 0.12, engs,
        np.where(r < 0.48, kws,
                 np.where(r < 0.72, idents, np.where(r < 0.82, nums, puncts))),
    )


def _render(toks, rng: np.random.Generator) -> str:
    sep = np.where(rng.random(len(toks)) < 0.15, "\n", " ")
    parts = np.empty(2 * len(toks), dtype=object)
    parts[0::2] = toks
    parts[1::2] = sep
    return "".join(parts.tolist())


def _lang_draws(n_docs: int, seed: int):
    master = np.random.default_rng([seed, 0])
    repo_of = _zipf_repos(n_docs, master)
    langs = np.array(LANGS)[
        master.choice(len(LANGS), n_docs, p=_LANG_W / _LANG_W.sum())
    ]
    return repo_of, langs


def generate_range(
    lo: int, hi: int, n_docs: int, seed: int = 42
) -> pa.Table:
    """Generate docs [lo, hi) of an n_docs corpus; lo must be CHUNK-aligned."""
    assert lo % CHUNK == 0, "range must start on a chunk boundary"
    repo_of, langs = _lang_draws(n_docs, seed)
    repos, paths, commits, langcol, contents = [], [], [], [], []
    for c0 in range(lo, hi, CHUNK):
        c1 = min(c0 + CHUNK, hi, n_docs)
        cid = c0 // CHUNK
        rng = np.random.default_rng([seed, 1, cid])
        m = c1 - c0
        sizes = rng.integers(50, 2001, m)
        toks_per_doc: list = [None] * m
        chunk_langs = langs[c0:c1]
        for lang in sorted(set(chunk_langs.tolist())):
            sel = np.flatnonzero(chunk_langs == lang)
            total = int(sizes[sel].sum())
            flat = _gen_tokens_flat(rng, lang, total)
            offs = np.concatenate([[0], np.cumsum(sizes[sel])])
            for j, di in enumerate(sel):
                toks_per_doc[di] = flat[offs[j]:offs[j + 1]]
        prev_tokens = None
        prev_content = None
        for j in range(m):
            i = c0 + j
            lang = str(chunk_langs[j])
            if i % DUP_EVERY == 1 and prev_content is not None:
                content = prev_content
                lang = langcol[-1]
            elif i % NEAR_EVERY == 3 and prev_tokens is not None:
                # one contiguous ~1% edit run: token overlap ~0.99 and
                # 8-gram shingle overlap ~0.97 — above the reference
                # detector's 0.90 signature threshold (scattered edits
                # would destroy ~8x as many shingles as tokens)
                toks = np.array(prev_tokens, dtype=object)
                n_edit = max(1, len(toks) // 100)
                p0 = int(rng.integers(0, max(1, len(toks) - n_edit)))
                toks[p0:p0 + n_edit] = rng.choice(_ENGLISH, n_edit)
                lang = langcol[-1]
                content = _render(toks, rng)
                prev_tokens = toks.tolist()
            else:
                toks = toks_per_doc[j].tolist()
                if i % UNICODE_EVERY == 5:
                    toks = toks + [str(w) for w in rng.choice(_UNICODE_WORDS, 6)]
                content = _render(toks, rng)
                prev_tokens = toks
            prev_content = content
            repo = repo_of[i]
            path = f"src/dir{int(rng.integers(0, 20))}/file{i}.{_EXTS[lang]}"
            commit = hashlib.sha1(f"{repo}/{path}@{seed}".encode()).hexdigest()
            repos.append(repo)
            paths.append(path)
            commits.append(commit)
            langcol.append(lang)
            contents.append(content)
    return pa.table(
        {
            "repo": pa.array(repos),
            "path": pa.array(paths),
            "commit": pa.array(commits),
            "lang": pa.array(langcol),
            "content": pa.array(contents),
        }
    )


def generate_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Generate the whole corpus as one Arrow table (row order = doc order)."""
    return generate_range(0, n_docs, n_docs, seed)


def _zipf_repos(n_docs: int, rng: np.random.Generator) -> list[str]:
    names = [f"org{i}/proj{j}" for i in range(8) for j in range(16)]
    w = 1.0 / np.arange(1, len(names) + 1) ** 1.2
    idx = rng.choice(len(names), n_docs, p=w / w.sum())
    return [names[k] for k in idx]


def _file_bounds(n_docs: int, n_files: int) -> np.ndarray:
    """CHUNK-aligned file boundaries."""
    bounds = np.linspace(0, n_docs, n_files + 1).astype(int)
    bounds = (bounds // CHUNK) * CHUNK
    bounds[-1] = n_docs
    return np.unique(bounds)


def write_corpus(
    out_dir: str, n_docs: int, seed: int = 42, n_files: int = 4
) -> list[str]:
    """Write the corpus as parquet fragments (driver-side, small corpora)."""
    os.makedirs(out_dir, exist_ok=True)
    bounds = _file_bounds(n_docs, n_files)
    paths = []
    for f in range(len(bounds) - 1):
        t = generate_range(int(bounds[f]), int(bounds[f + 1]), n_docs, seed)
        p = os.path.join(out_dir, f"corpus-{f:05d}.parquet")
        pq.write_table(t, p, row_group_size=max(64, n_docs // (len(bounds) * 4)))
        paths.append(p)
    return paths


def write_corpus_ray(
    out_dir: str, n_docs: int, seed: int = 42, n_files: int = 32
) -> list[str]:
    """Distributed generation: one Ray task per output file; cached by a
    DONE marker, so bench reruns reuse the corpus."""
    import ray

    marker = os.path.join(out_dir, f"DONE-{n_docs}-{seed}-{n_files}")
    if os.path.exists(marker):
        return sorted(
            os.path.join(out_dir, f) for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        os.remove(os.path.join(out_dir, f))
    bounds = _file_bounds(n_docs, n_files)

    @ray.remote
    def gen(f: int, lo: int, hi: int) -> str:
        t = generate_range(lo, hi, n_docs, seed)
        p = os.path.join(out_dir, f"corpus-{f:05d}.parquet")
        pq.write_table(t, p, row_group_size=4096)
        return p

    paths = ray.get(
        [
            gen.remote(f, int(bounds[f]), int(bounds[f + 1]))
            for f in range(len(bounds) - 1)
        ]
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return sorted(paths)
