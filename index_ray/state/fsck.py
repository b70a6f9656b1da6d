"""Index integrity checker (fsck) — validate an index directory against
its manifests and internal invariants without trusting any of them.

The reference has no equivalent (a crashed chunk is silently lost,
``/root/reference/index.cpp:48-58``); here every chunk's lineage manifest
(``state/manifest.py``) makes corruption DETECTABLE, and this pass makes
it detected: one Ray task per chunk re-derives the manifest's claims from
the bytes on disk.

Per chunk: manifest present + config fingerprint matches stats.json +
every recorded output file exists with its recorded size; docmap docIDs
unique and inside the manifest's [doc_min, doc_max]; docmap row/token
sums equal the manifest's; lexicon-partial cf sum equals the token count
(content terms only — marker namespaces add postings on top); a sample
of posting blocks decodes with strictly-increasing docIDs that all exist
in the docmap, with block df equal to the decoded count.

Global: chunk docs/tokens sum to stats.json N/total_tokens; avgdl
consistent; the merged lexicon's (Sigma df, Sigma cf) equal the chunk
partials' sums.

Scale shape: chunks are checked in parallel (one task each, bounded
decode sample per part file); nothing is materialized beyond per-chunk
scalars, so fsck over a 10^6-chunk index is a flat task fan-out.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..stages.pack import unpack_block
from .manifest import manifest_path, read_json

BLOCK_SAMPLE_PER_FILE = 64


@ray.remote
def _check_chunk(chunk_dir: str, fingerprint: str, has_markers: bool) -> dict:
    issues: list[str] = []
    m = read_json(manifest_path(chunk_dir))
    if not m:
        return {"chunk_dir": chunk_dir, "docs": 0, "tokens": 0,
                "issues": ["manifest missing/unreadable"]}
    if m.get("config_fingerprint") != fingerprint:
        issues.append("config fingerprint mismatch vs stats.json")
    for rel, size in m.get("files", {}).items():
        p = os.path.join(chunk_dir, rel)
        try:
            actual = os.path.getsize(p)
        except OSError:
            issues.append(f"missing file {rel}")
            continue
        if actual != size:
            issues.append(f"size mismatch {rel}: {actual} != {size}")

    # docmap: uniqueness, range, counts
    dm_files = sorted(glob.glob(os.path.join(chunk_dir, "docmap", "*.parquet")))
    ids_parts, tok_sum = [], 0
    for f in dm_files:
        try:
            t = pq.read_table(f, columns=["docID", "n_tokens"])
        except Exception as e:  # corrupted parquet counts as an issue
            issues.append(f"unreadable docmap {os.path.basename(f)}: {e}")
            continue
        ids_parts.append(t["docID"].to_numpy(zero_copy_only=False))
        tok_sum += int(pa.compute.sum(t["n_tokens"]).as_py() or 0)
    ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    if len(np.unique(ids)) != len(ids):
        issues.append("duplicate docIDs in docmap")
    if len(ids):
        if int(ids.min()) < m["doc_min"] or int(ids.max()) > m["doc_max"]:
            issues.append("docmap docIDs outside manifest [doc_min, doc_max]")
    if len(ids) != m["docs"]:
        issues.append(f"docmap rows {len(ids)} != manifest docs {m['docs']}")
    if tok_sum != m["tokens"]:
        issues.append(f"docmap token sum {tok_sum} != manifest tokens {m['tokens']}")

    # lexicon partials: content-term cf must equal the token count exactly
    # (marker namespaces like head:/field: add postings on top)
    lex_files = sorted(glob.glob(os.path.join(chunk_dir, "lexicon", "*.parquet")))
    cf_sum = 0
    for f in lex_files:
        try:
            t = pq.read_table(f, columns=["term", "cf"])
        except Exception as e:
            issues.append(f"unreadable lexicon {os.path.basename(f)}: {e}")
            continue
        if has_markers:
            keep = pa.compute.invert(
                pa.compute.match_substring(t["term"], ":")
            )
            t = t.filter(keep)
        cf_sum += int(pa.compute.sum(t["cf"]).as_py() or 0)
    if cf_sum != m["tokens"]:
        issues.append(f"lexicon cf sum {cf_sum} != manifest tokens {m['tokens']}")

    # posting blocks: sample-decode; df == decoded count, docIDs strictly
    # increasing and present in the docmap
    idset = np.sort(ids)
    for f in sorted(glob.glob(os.path.join(chunk_dir, "parts", "*.parquet"))):
        try:
            t = pq.read_table(f, columns=["term", "df", "postings"])
        except Exception as e:
            issues.append(f"unreadable part {os.path.basename(f)}: {e}")
            continue
        n = min(len(t), BLOCK_SAMPLE_PER_FILE)
        if n == 0:
            continue
        step = max(1, len(t) // n)
        for i in range(0, len(t), step):
            df_i = int(t["df"][i].as_py())
            docs, _ = unpack_block(t["postings"][i].as_py(), df_i)
            if len(docs) != df_i:
                issues.append(f"{os.path.basename(f)} row {i}: decoded "
                              f"{len(docs)} postings, df says {df_i}")
                break
            if len(docs) > 1 and not (np.diff(docs) > 0).all():
                issues.append(f"{os.path.basename(f)} row {i}: docIDs not "
                              "strictly increasing")
                break
            pos = np.searchsorted(idset, docs)
            ok = (pos < len(idset)) & (idset[np.minimum(pos, len(idset) - 1)] == docs)
            if not ok.all():
                issues.append(f"{os.path.basename(f)} row {i}: posting docID "
                              "absent from docmap")
                break

    return {"chunk_dir": chunk_dir, "docs": int(len(ids)), "tokens": int(tok_sum),
            "issues": issues}


def fsck_index(out_dir: str) -> pa.Table:
    """Check every chunk in parallel; returns one row per chunk plus a
    ``__global__`` row — (scope, docs, tokens, n_issues, issues)."""
    from ..pipelines.build import load_stats

    stats = load_stats(out_dir)
    fp = stats["config_fingerprint"]
    has_markers = bool(stats.get("field_col") or stats.get("head_tokens"))
    chunk_dirs = sorted(glob.glob(os.path.join(out_dir, "chunks", "chunk-*")))
    results = ray.get(
        [_check_chunk.remote(d, fp, has_markers) for d in chunk_dirs]
    )

    gissues: list[str] = []
    if {c["chunk"] for c in stats["chunks"]} != {
        int(os.path.basename(d).split("-")[1]) for d in chunk_dirs
    }:
        gissues.append("stats.json chunk list != chunk dirs on disk")
    docs = sum(r["docs"] for r in results)
    tokens = sum(r["tokens"] for r in results)
    if docs != stats["N"]:
        gissues.append(f"chunk docs sum {docs} != stats N {stats['N']}")
    if tokens != stats["total_tokens"]:
        gissues.append(
            f"chunk token sum {tokens} != stats total_tokens {stats['total_tokens']}"
        )
    if docs and abs(stats["avgdl"] - tokens / docs) > 1e-9:
        gissues.append("avgdl inconsistent with totals")
    glex = sorted(glob.glob(os.path.join(out_dir, "lexicon", "*.parquet")))
    gdf = gcf = 0
    for f in glex:
        t = pq.read_table(f, columns=["df", "cf"])
        gdf += int(pa.compute.sum(t["df"]).as_py() or 0)
        gcf += int(pa.compute.sum(t["cf"]).as_py() or 0)
    pdf = pcf = 0
    for d in chunk_dirs:
        for f in sorted(glob.glob(os.path.join(d, "lexicon", "*.parquet"))):
            t = pq.read_table(f, columns=["df", "cf"])
            pdf += int(pa.compute.sum(t["df"]).as_py() or 0)
            pcf += int(pa.compute.sum(t["cf"]).as_py() or 0)
    if (gdf, gcf) != (pdf, pcf):
        gissues.append(
            f"merged lexicon (df={gdf}, cf={gcf}) != chunk partials (df={pdf}, cf={pcf})"
        )
    # reversed-term sidecar, when present, must mirror the merged lexicon
    # exactly: same term multiset, every rev_term the codepoint reverse of
    # its term, rows sorted by rev_term (the range-probe precondition)
    rev_dir = os.path.join(out_dir, "lexicon_rev")
    if os.path.isdir(rev_dir):
        try:
            rt = pa.concat_tables(
                [
                    pq.read_table(f, columns=["rev_term", "term"])
                    for f in sorted(glob.glob(os.path.join(rev_dir, "*.parquet")))
                ]
            )
            lex_terms = pa.concat_tables(
                [pq.read_table(f, columns=["term"]) for f in glex]
            )["term"]
            rev = rt["rev_term"].to_numpy(zero_copy_only=False)
            if rt.num_rows != len(lex_terms):
                gissues.append(
                    f"reverse lexicon rows {rt.num_rows} != lexicon terms "
                    f"{len(lex_terms)}"
                )
            else:
                import numpy as np

                if not (
                    np.sort(rt["term"].to_numpy(zero_copy_only=False))
                    == np.sort(lex_terms.to_numpy(zero_copy_only=False))
                ).all():
                    gissues.append("reverse lexicon term set != lexicon terms")
                want_rev = pa.compute.utf8_reverse(rt["term"]).to_numpy(
                    zero_copy_only=False
                )
                if not (rev == want_rev).all():
                    gissues.append("reverse lexicon rev_term != reverse(term)")
            if len(rev) > 1 and not (rev[:-1] <= rev[1:]).all():
                gissues.append("reverse lexicon not sorted by rev_term")
        except Exception as e:
            gissues.append(f"unreadable reverse lexicon: {e}")

    rows = [
        (os.path.basename(r["chunk_dir"]), r["docs"], r["tokens"],
         len(r["issues"]), "; ".join(r["issues"]))
        for r in results
    ] + [("__global__", docs, tokens, len(gissues), "; ".join(gissues))]
    return pa.table(
        {
            "scope": pa.array([r[0] for r in rows], pa.string()),
            "docs": pa.array([r[1] for r in rows], pa.int64()),
            "tokens": pa.array([r[2] for r in rows], pa.int64()),
            "n_issues": pa.array([r[3] for r in rows], pa.int64()),
            "issues": pa.array([r[4] for r in rows], pa.string()),
        }
    )
