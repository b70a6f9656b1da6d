"""``ray job submit``-compatible entrypoint for the index engine.

On a fixed-size multi-node cluster the whole lifecycle runs as driver
scripts submitted to the head node::

    ray job submit --working-dir . -- python -m index_ray.job build \
        --source s3://corpus/code/ --out /shared/index --chunk-docs 1000000
    ray job submit --working-dir . -- python -m index_ray.job append \
        --source s3://corpus/code-new/ --out /shared/index
    ray job submit --working-dir . -- python -m index_ray.job query \
        --index /shared/index --q "vector push_back" --k 10 --meta repo,path

Each subcommand attaches to the running cluster via ``ray.init()`` (which
honours ``RAY_ADDRESS``; in this sandbox that is preset to ``local``), never
re-inits an existing session, and prints exactly ONE machine-readable JSON
line on stdout — ``build``/``append`` echo the per-stage throughput metrics
that :func:`index_ray.pipelines.build.write_metrics` also persists to
``<out>/metrics.json``, satisfying the "emit per-stage throughput metrics"
contract; ``query`` prints the top-k rows.

The reference engine has no CLI (it is linked into a crawler,
``/root/reference/index.cpp``); this module is the operational surface a
standalone 100 TB deployment needs instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        # ray.init() honours RAY_ADDRESS ("auto" on a cluster via job
        # submit, "local" in this sandbox); never owns an existing session.
        ray.init(include_dashboard=False, ignore_reinit_error=True)


def _build_cfg(a: argparse.Namespace):
    from .pipelines.build import BuildConfig

    kw: dict = {}
    if a.tokenizer:
        kw["tokenizer"] = a.tokenizer
    if a.text_col:
        kw["text_col"] = a.text_col
    if a.chunk_docs:
        kw["chunk_docs"] = a.chunk_docs
    if a.keep_cols:
        kw["keep_cols"] = tuple(c for c in a.keep_cols.split(",") if c)
    if a.positions:
        kw["positions"] = True
    if a.field_col:
        kw["field_col"] = a.field_col
    if a.shuffle:
        kw["shuffle"] = a.shuffle
    if a.style_head:
        kw["style_head"] = a.style_head
    if getattr(a, "style_levels", None):
        kw["style_levels"] = tuple(
            int(x) for x in a.style_levels.split(",") if x
        )
    return BuildConfig(**kw)


def _cmd_build(a: argparse.Namespace) -> dict:
    from .pipelines.build import append_index, build_index
    from .state.manifest import read_json

    _init_ray()
    cfg = _build_cfg(a)
    if a.cmd == "upsert":
        from .pipelines.compact import upsert_index

        r = upsert_index(a.source, a.out, cfg, key_col=a.key_col)
        m = read_json(os.path.join(a.out, "metrics.json")) or {}
        return {**m, **r}
    fn = append_index if a.cmd == "append" else build_index
    fn(a.source, a.out, cfg)
    return read_json(os.path.join(a.out, "metrics.json")) or {}


def _cmd_query(a: argparse.Namespace) -> dict:
    from .pipelines.query import BM25Searcher

    _init_ray()
    s = BM25Searcher(a.index, snapshot=a.snapshot)
    meta = [c for c in (a.meta or "").split(",") if c]
    t = s.search(a.q, k=a.k, mode=a.mode, meta_cols=meta or None)
    return {"query": a.q, "k": a.k, "mode": a.mode, "rows": t.to_pylist()}


def _cmd_fsck(a: argparse.Namespace) -> dict:
    from .state.fsck import fsck_index

    _init_ray()
    t = fsck_index(a.index)
    rows = t.to_pylist()
    return {"n_issues": sum(r["n_issues"] for r in rows), "rows": rows}


def _stats_summary(stats: dict) -> dict:
    return {
        "N": stats.get("N"),
        "total_tokens": stats.get("total_tokens"),
        "avgdl": stats.get("avgdl"),
        "n_chunks": len(stats.get("chunks", [])),
        "n_tombstoned": stats.get("n_tombstoned", 0),
        "tokenizer": stats.get("tokenizer"),
        "positions": stats.get("positions"),
    }


def _cmd_compact(a: argparse.Namespace) -> dict:
    from .pipelines.compact import compact_index

    _init_ray()
    return _stats_summary(compact_index(a.index, group_docs=a.group_docs))


def _cmd_merge(a: argparse.Namespace) -> dict:
    from .pipelines.compact import merge_indexes

    _init_ray()
    return _stats_summary(merge_indexes(a.dst, a.src))


def _cmd_delete(a: argparse.Namespace) -> dict:
    from .pipelines.compact import delete_docs

    _init_ray()
    ids = [int(x) for x in a.ids.split(",") if x]
    return _stats_summary(delete_docs(a.index, ids))


def _cmd_stats(a: argparse.Namespace) -> dict:
    from .pipelines.build import load_stats

    return _stats_summary(load_stats(a.index))


def _cmd_snapshots(a: argparse.Namespace) -> dict:
    from .state.snapshots import list_snapshots

    return {
        "snapshots": [
            {
                "version": m["version"],
                "n_chunks": len(m["stats"].get("chunks", [])),
                "N": m["stats"].get("N"),
                "n_tombstone_files": len(m.get("tombstone_files", [])),
            }
            for m in list_snapshots(a.index)
        ]
    }


def _cmd_snapshot(a: argparse.Namespace) -> dict:
    from .state.snapshots import snapshot_index

    return {"version": snapshot_index(a.index)}


def _cmd_rollback(a: argparse.Namespace) -> dict:
    from .state.snapshots import rollback_to_snapshot

    st = rollback_to_snapshot(a.index, a.version)
    return {"version": a.version, **_stats_summary(st)}


def _cmd_expire(a: argparse.Namespace) -> dict:
    from .state.snapshots import expire_snapshots

    return {"expired": expire_snapshots(a.index, keep_last=a.keep_last)}


def _cmd_reverse_lexicon(a: argparse.Namespace) -> dict:
    from .pipelines.query import build_reverse_lexicon

    _init_ray()
    return {"terms": build_reverse_lexicon(a.index)}


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="python -m index_ray.job")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("build", "append", "upsert"):
        b = sub.add_parser(name)
        b.add_argument("--source", required=True, help="parquet file/dir/glob")
        b.add_argument("--out", required=True, help="index directory")
        b.add_argument("--tokenizer", choices=["code", "simple"], default=None)
        b.add_argument("--text-col", default=None)
        b.add_argument("--chunk-docs", type=int, default=None)
        b.add_argument("--keep-cols", default=None, help="docmap passthrough, comma-sep")
        b.add_argument("--positions", action="store_true")
        b.add_argument("--field-col", default=None)
        b.add_argument("--style-head", type=int, default=0)
        b.add_argument("--style-levels", default=None,
                       help="3 ascending ints, comma-sep (2-bit style enum)")
        b.add_argument("--shuffle", choices=["bucket", "sort", "hash"], default=None)
        if name == "upsert":
            b.add_argument(
                "--key-col", default="path",
                help="docmap identity column matched for replacement",
            )
        b.set_defaults(fn=_cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", choices=["or", "and", "msm"], default="or")
    q.add_argument("--meta", default=None, help="docmap columns to join, comma-sep")
    q.add_argument("--snapshot", type=int, default=None,
                   help="read AS OF this published version (time travel)")
    q.set_defaults(fn=_cmd_query)

    f = sub.add_parser("fsck")
    f.add_argument("--index", required=True)
    f.set_defaults(fn=_cmd_fsck)

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)
    c.add_argument("--group-docs", type=int, default=None)
    c.set_defaults(fn=_cmd_compact)

    m = sub.add_parser("merge")
    m.add_argument("--dst", required=True, help="index that adopts the chunks")
    m.add_argument("--src", required=True, help="index whose chunks are adopted")
    m.set_defaults(fn=_cmd_merge)

    d = sub.add_parser("delete")
    d.add_argument("--index", required=True)
    d.add_argument("--ids", required=True, help="docIDs to tombstone, comma-sep")
    d.set_defaults(fn=_cmd_delete)

    s = sub.add_parser("stats")
    s.add_argument("--index", required=True)
    s.set_defaults(fn=_cmd_stats)

    sl = sub.add_parser("snapshots", help="list readable index versions")
    sl.add_argument("--index", required=True)
    sl.set_defaults(fn=_cmd_snapshots)

    sn = sub.add_parser("snapshot", help="publish the current state as a version")
    sn.add_argument("--index", required=True)
    sn.set_defaults(fn=_cmd_snapshot)

    rb = sub.add_parser("rollback", help="restore a published version in place")
    rb.add_argument("--index", required=True)
    rb.add_argument("--version", type=int, required=True)
    rb.set_defaults(fn=_cmd_rollback)

    ex = sub.add_parser("expire-snapshots", help="drop old versions")
    ex.add_argument("--index", required=True)
    ex.add_argument("--keep-last", type=int, default=2)
    ex.set_defaults(fn=_cmd_expire)

    rl = sub.add_parser(
        "reverse-lexicon",
        help="(re)build the reversed-term sidecar for suffix wildcards",
    )
    rl.add_argument("--index", required=True)
    rl.set_defaults(fn=_cmd_reverse_lexicon)

    a = p.parse_args(argv)
    out = a.fn(a)
    json.dump(out, sys.stdout, default=str)
    sys.stdout.write("\n")
    return out


if __name__ == "__main__":
    main()
