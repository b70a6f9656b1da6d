"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema fixed by BASELINE.json ``input_hint``:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Properties the generator guarantees (all seeded, no external data):

- zipf-ish skew of files-per-repo;
- per-``lang`` keyword pools + snake/camel identifiers + literals +
  English comment lines (exercises the Porter stemmer);
- >= 5 hot terms (``def return int i the``) present in > 60% of docs, to
  force the salted-groupby path;
- planted exact-duplicate pairs (every ``DUP_EVERY``-th doc) and
  near-duplicate pairs (>= 0.9 token overlap, every ``NEAR_EVERY``-th doc)
  for the dedup oracles;
- a few Unicode docs (accents + CJK) to exercise NFKD/casefold.

Content for doc *i* depends only on ``(seed, i)`` — stable under any file
split or parallelism.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

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
        parts = np.array(_IDENT_PARTS)
        cap = np.array([p.capitalize() for p in _IDENT_PARTS])
        hit = (np.array(_KEYWORDS[lang]), np.array(_ENGLISH), parts, cap,
               np.array(_PUNCT + (["#"] if lang in ("python", "md") else ["//"])))
        _POOL_CACHE[lang] = hit
    return hit


def _doc_tokens(rng: np.random.Generator, lang: str) -> list[str]:
    n = int(rng.integers(50, 2001))
    kw, eng, parts, cap, punct = _pools(lang)
    r = rng.random(n)
    kws = kw[rng.integers(0, len(kw), n)]
    engs = eng[rng.integers(0, len(eng), n)]
    a = parts[rng.integers(0, len(parts), n)]
    b_i = rng.integers(0, len(parts), n)
    snake = np.char.add(np.char.add(a, "_"), parts[b_i])
    camel = np.char.add(a, cap[b_i])
    idents = np.where(rng.random(n) < 0.5, snake, camel)
    nums = rng.integers(0, 10000, n).astype("U6")
    puncts = punct[rng.integers(0, len(punct), n)]
    toks = np.where(
        r < 0.12, engs,
        np.where(r < 0.48, kws,
                 np.where(r < 0.72, idents, np.where(r < 0.82, nums, puncts))),
    )
    return toks.tolist()


def _render(toks: list[str], rng: np.random.Generator) -> str:
    sep = np.where(rng.random(len(toks)) < 0.15, "\n", " ")
    parts = np.empty(2 * len(toks), dtype=object)
    parts[0::2] = toks
    parts[1::2] = sep
    return "".join(parts.tolist())


def generate_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Generate the corpus as one Arrow table, row order = doc order."""
    master = np.random.default_rng([seed, 0])
    repo_of = _zipf_repos(n_docs, master)
    langs = np.array(LANGS)[
        master.choice(len(LANGS), n_docs, p=_LANG_W / _LANG_W.sum())
    ]
    repos, paths, commits, langcol, contents = [], [], [], [], []
    prev_tokens: list[str] | None = None
    prev_content: str | None = None
    for i in range(n_docs):
        rng = np.random.default_rng([seed, 1, i])
        lang = str(langs[i])
        if i % DUP_EVERY == 1 and prev_content is not None:
            content = prev_content          # exact duplicate of doc i-1
            lang = langcol[-1]
        elif i % NEAR_EVERY == 3 and prev_tokens is not None:
            toks = list(prev_tokens)        # near duplicate: ~5% token edits
            n_edit = max(1, len(toks) // 20)
            pos = rng.integers(0, len(toks), n_edit)
            for p in pos:
                toks[int(p)] = str(rng.choice(_ENGLISH))
            lang = langcol[-1]
            content = _render(toks, rng)
            prev_tokens = toks
        else:
            toks = _doc_tokens(rng, lang)
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


def _zipf_repos(n_docs: int, rng: np.random.Generator) -> list[str]:
    names = [f"org{i}/proj{j}" for i in range(8) for j in range(16)]
    w = 1.0 / np.arange(1, len(names) + 1) ** 1.2
    idx = rng.choice(len(names), n_docs, p=w / w.sum())
    return [names[k] for k in idx]


def write_corpus(
    out_dir: str, n_docs: int, seed: int = 42, n_files: int = 4
) -> list[str]:
    """Write the corpus as ``n_files`` parquet fragments; returns the paths.

    File boundaries are deterministic row splits, so docIDs derived from
    sorted fragment paths reproduce the generation order exactly.
    """
    os.makedirs(out_dir, exist_ok=True)
    table = generate_corpus(n_docs, seed)
    bounds = np.linspace(0, n_docs, n_files + 1).astype(int)
    paths = []
    for f in range(n_files):
        p = os.path.join(out_dir, f"corpus-{f:05d}.parquet")
        pq.write_table(table.slice(bounds[f], bounds[f + 1] - bounds[f]), p,
                       row_group_size=max(256, n_docs // (n_files * 4)))
        paths.append(p)
    return paths
