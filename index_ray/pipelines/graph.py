"""Iterative graph analytics over relationship tables: distributed
PageRank in exact integer fixed-point arithmetic.

The graph here is the customer<->supplier interaction graph implied by the
order tables (an edge per distinct (customer, supplier) pair that shares a
lineitem), but the kernel is generic: any int64 (src, dst) edge list.

Why integer fixed-point: float PageRank sums depend on reduction order, so
a distributed run could never hash-compare against a SQL oracle (or against
itself across cluster sizes).  Ranks are held as int64 multiples of
1/SCALE and every step is defined in floor division:

    r0[v]   = SCALE // n_nodes
    r_i[v]  = (15*SCALE//100) // n_nodes
              + sum over in-edges (u,v) of ((r_{i-1}[u] * 85 // 100) // deg[u])

Integer sums are associative-exact, so the result is bitwise identical at
any parallelism — the property every other exact operator in this repo
leans on (see events.py money-in-cents).  The small mass truncation floor
division leaks is part of the definition, mirrored exactly by the oracle.

Distribution shape (the classic Pregel/BSP layout as Ray tasks):

- edges are bucketed by ``hash(src)`` ONCE (``num_returns`` fan-out per
  upstream block, same map-side shuffle as ``util.hash_groupby``) and held
  in the object store across iterations — the edge list never moves again;
- ranks live in per-bucket tables under the SAME hash, so each iteration's
  scatter task gets its bucket's edges + ranks co-located: vectorized
  searchsorted join, per-edge contribution, partial sums split by
  ``hash(dst)`` (``num_returns`` fan-out again);
- one gather task per destination bucket sums partials + teleport base.

Per iteration the only data crossing the object store is the pre-summed
(dst, contrib) partials — O(buckets x distinct dst per bucket), not
O(edges).  Driver state is B x B ObjectRefs per iteration.

Reference parity note: the reference engine has no graph operators; this
is the training-data-side extension (web-graph PageRank is the canonical
quality prior for crawl corpora — the reference's crawler ranks frontier
URLs by indegree-ish heuristics, ``/root/reference`` crawler notes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..util import hash_groupby
from .join import _knuth_bucket, hash_join

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 in exact rational form


def _order_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct (customer, supplier) pairs sharing a lineitem, as an
    undirected int64 edge list: node = 2*custkey / 2*suppkey+1."""

    def okey_orders(t: pa.Table) -> pa.Table:
        return pa.table({"okey": t["o_orderkey"], "cust": t["o_custkey"]})

    def okey_items(t: pa.Table) -> pa.Table:
        return pa.table({"okey": t["l_orderkey"], "supp": t["l_suppkey"]})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(okey_orders, batch_format="pyarrow")
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(okey_items, batch_format="pyarrow")

    def to_pairs(t: pa.Table) -> pa.Table:
        c = t["cust"].to_numpy(zero_copy_only=False) * 2
        s = t["supp"].to_numpy(zero_copy_only=False) * 2 + 1
        return pa.table(
            {"a": pa.array(c, pa.int64()), "b": pa.array(s, pa.int64())}
        )

    pairs = hash_join(orders, items, on="okey").map_batches(
        to_pairs, batch_format="pyarrow"
    )

    def distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        if a.max(initial=0) >= 1 << 32 or b.max(initial=0) >= 1 << 32:
            # loud, not silently wrong: >32-bit node ids need the lexsort
            # pair-unique (np.unique over a structured view) instead
            raise ValueError("fused pair-distinct assumes node ids < 2^32")
        fused = np.unique((a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64))
        return pa.table(
            {
                "a": pa.array((fused >> np.uint64(32)).astype(np.int64)),
                "b": pa.array((fused & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            }
        )

    uniq = hash_groupby(pairs, ["a", "b"], distinct)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    return uniq.map_batches(both_dirs, batch_format="pyarrow")


@ray.remote
def _edge_split(block, nparts: int):
    """Fan one edge block out into per-src-bucket tables."""
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    if t.num_rows == 0:
        return tuple(t for _ in range(nparts)) if nparts > 1 else t
    b = _knuth_bucket(t["src"].to_numpy(zero_copy_only=False), nparts)
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nparts + 1))
    out = tuple(t.take(order[bounds[i] : bounds[i + 1]]) for i in range(nparts))
    return out if nparts > 1 else out[0]


@ray.remote
def _edge_bucket(*parts: pa.Table) -> pa.Table:
    """Concat one bucket's edge parts, sorted by src (searchsorted-ready),
    with the per-src out-degree attached once."""
    live = [p for p in parts if p.num_rows]
    if not live:
        return pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("deg", pa.int64())]
        ).empty_table()
    t = pa.concat_tables(live, promote_options="default")
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    uniq, counts = np.unique(src, return_counts=True)
    deg = np.repeat(counts, counts)
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "deg": pa.array(deg, pa.int64()),
        }
    )


@ray.remote
def _bucket_nodes(edges: pa.Table) -> pa.Table:
    src = edges["src"].to_numpy(zero_copy_only=False)
    return pa.table({"node": pa.array(np.unique(src), pa.int64())})


@ray.remote
def _init_ranks(nodes: pa.Table, n_nodes: int) -> pa.Table:
    r = np.full(nodes.num_rows, SCALE // n_nodes, dtype=np.int64)
    return pa.table({"node": nodes["node"], "r": pa.array(r, pa.int64())})


@ray.remote
def _pr_scatter(edges: pa.Table, ranks: pa.Table, nparts: int):
    """One bucket's scatter: join ranks to its (src-sorted) edges, emit
    per-dst partial contribution sums split by hash(dst)."""
    empty = pa.schema([("dst", pa.int64()), ("c", pa.int64())]).empty_table()
    if edges.num_rows == 0 or ranks.num_rows == 0:
        return tuple(empty for _ in range(nparts)) if nparts > 1 else empty
    src = edges["src"].to_numpy(zero_copy_only=False)
    dst = edges["dst"].to_numpy(zero_copy_only=False)
    deg = edges["deg"].to_numpy(zero_copy_only=False)
    node = ranks["node"].to_numpy(zero_copy_only=False)
    r = ranks["r"].to_numpy(zero_copy_only=False)
    order = np.argsort(node, kind="stable")
    node, r = node[order], r[order]
    # every src is a node of this bucket by construction
    r_src = r[np.searchsorted(node, src)]
    contrib = (r_src * DAMP_NUM // DAMP_DEN) // deg
    # pre-sum by dst before the shuffle (the combiner step)
    du, inv = np.unique(dst, return_inverse=True)
    csum = np.zeros(len(du), dtype=np.int64)
    np.add.at(csum, inv, contrib)
    b = _knuth_bucket(du, nparts)
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nparts + 1))
    out = tuple(
        pa.table(
            {
                "dst": pa.array(du[order[bounds[i] : bounds[i + 1]]], pa.int64()),
                "c": pa.array(csum[order[bounds[i] : bounds[i + 1]]], pa.int64()),
            }
        )
        for i in range(nparts)
    )
    return out if nparts > 1 else out[0]


@ray.remote
def _pr_gather(base: int, *parts: pa.Table) -> pa.Table:
    live = [p for p in parts if p.num_rows]
    if not live:
        return pa.schema([("node", pa.int64()), ("r", pa.int64())]).empty_table()
    t = pa.concat_tables(live, promote_options="default")
    dst = t["dst"].to_numpy(zero_copy_only=False)
    c = t["c"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(dst, return_inverse=True)
    s = np.full(len(uniq), base, dtype=np.int64)
    np.add.at(s, inv, c)
    return pa.table(
        {"node": pa.array(uniq, pa.int64()), "r": pa.array(s, pa.int64())}
    )


def pagerank(
    sf_dir: str, iters: int = 3, num_buckets: int = 32
) -> ray.data.Dataset:
    """Integer fixed-point PageRank over the customer<->supplier graph.

    Output: (node, kind, rank_fp) — rank_fp is the int64 fixed-point rank
    (multiples of 1/SCALE) after ``iters`` synchronous iterations; kind
    tags the bipartite side.  Bitwise deterministic at any parallelism.
    """
    edges = _order_edges(sf_dir)

    # bucket the edge list once; it stays put for every iteration
    per_block = []
    for bundle in edges.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            if num_buckets > 1:
                per_block.append(
                    _edge_split.options(num_returns=num_buckets).remote(
                        bref, num_buckets
                    )
                )
            else:
                per_block.append((_edge_split.remote(bref, num_buckets),))
    if not per_block:
        empty = pa.schema(
            [("node", pa.int64()), ("kind", pa.string()), ("rank_fp", pa.int64())]
        ).empty_table()
        return ray.data.from_arrow(empty)
    ebuckets = [
        _edge_bucket.remote(*[pb[i] for pb in per_block])
        for i in range(num_buckets)
    ]
    nodes = [_bucket_nodes.remote(e) for e in ebuckets]
    n_nodes = sum(t.num_rows for t in ray.get(nodes))
    base = (15 * SCALE // 100) // n_nodes
    ranks = [_init_ranks.remote(t, n_nodes) for t in nodes]

    for _ in range(iters):
        partials = [
            _pr_scatter.options(num_returns=num_buckets).remote(e, r, num_buckets)
            if num_buckets > 1
            else (_pr_scatter.remote(e, r, num_buckets),)
            for e, r in zip(ebuckets, ranks)
        ]
        ranks = [
            _pr_gather.remote(base, *[p[i] for p in partials])
            for i in range(num_buckets)
        ]

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("node", pa.int64()), ("kind", pa.string()), ("rank_fp", pa.int64())]
            ).empty_table()
        n = t["node"].to_numpy(zero_copy_only=False)
        kind = np.where(n % 2 == 0, "customer", "supplier")
        return pa.table(
            {
                "node": t["node"],
                "kind": pa.array(kind.tolist(), pa.string()),
                "rank_fp": t["r"],
            }
        )

    return ray.data.from_arrow_refs(ranks).map_batches(
        label, batch_format="pyarrow"
    )


def pagerank_sql_oracle(iters: int = 3) -> str:
    damp = f"* {DAMP_NUM} // {DAMP_DEN}"
    prev = "r0"
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
          SELECT e.dst AS node,
                 CAST((SELECT base FROM n)
                      + sum((p.r {damp}) // d.d) AS BIGINT) AS r
          FROM edges e
          JOIN {prev} p ON e.src = p.node
          JOIN deg d ON d.src = e.src
          GROUP BY e.dst
        )"""
        )
        prev = f"r{i}"
    chain = ",\n        ".join(steps)
    return f"""
        WITH pairs AS (
          SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        edges AS (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b AS src, a AS dst FROM pairs
        ),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
        n AS (
          SELECT count(*) AS n_nodes,
                 (15 * {SCALE} // 100) // count(*) AS base
          FROM deg
        ),
        r0 AS (
          SELECT src AS node, CAST({SCALE} // n_nodes AS BIGINT) AS r
          FROM deg, n
        ),
        {chain}
        SELECT node,
               CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               r AS rank_fp
        FROM {prev}
    """


# --------------------------------------------- connected components ----

_CCP_SCHEMA = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("edge", pa.int8())]
)


def _lang_path_rows(t: pa.Table) -> pa.Table:
    """One lang bucket -> per-language doc-id PATH edges plus singleton
    self-labels.

    Docs of a language are chained as a path (sorted doc_ids, k-1 edges),
    not a clique: the component minimum is then only recoverable by
    multi-hop label propagation, which is what the operator exists to
    exercise.  Languages with a single document emit an ``edge = 0``
    self-label row instead (cc rounds drop self-loops by design)."""
    if t.num_rows == 0:
        return _CCP_SCHEMA.empty_table()
    t = t.select(["doc_id", "lang"]).sort_by(
        [("lang", "ascending"), ("doc_id", "ascending")]
    )
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    lang = t["lang"].to_numpy(zero_copy_only=False)
    same = lang[1:] == lang[:-1] if len(ids) > 1 else np.zeros(0, bool)
    sel = np.flatnonzero(same)
    single = ids[~np.r_[False, same] & ~np.r_[same, False]]
    return pa.table(
        {
            "u": pa.array(np.concatenate([ids[sel], single]), pa.int64()),
            "v": pa.array(np.concatenate([ids[sel + 1], single]), pa.int64()),
            "edge": pa.array(
                np.r_[np.ones(len(sel), np.int8), np.zeros(len(single), np.int8)]
            ),
        }
    )


_CC_OUT = pa.schema([("doc_id", pa.int64()), ("component", pa.int64())])


def _ccp_edges(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
    m = t.filter(pc.equal(t["edge"], 1))
    return pa.table({"a": m["u"], "b": m["v"]})


def _ccp_singles(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _CC_OUT.empty_table()
    m = t.filter(pc.equal(t["edge"], 0))
    return pa.table({"doc_id": m["u"], "component": m["v"]})


def _ccp_rename(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _CC_OUT.empty_table()
    return pa.table({"doc_id": t["doc_id"], "component": t["cluster_rep"]})


def connected_components(
    sf_dir: str,
    num_partitions: int | None = None,
    distributed: bool | None = None,
) -> ray.data.Dataset:
    """Distributed connected components (alternating large-star/small-star
    rounds, ``dedup.cc_clusters``) surfaced as a public query over the
    per-language document paths.

    Output: (doc_id, component) for EVERY document, where component is the
    minimum doc_id of the doc's language group.  The SQL oracle states that
    directly (one window aggregate); the engine must EARN it through
    O(log n) propagation rounds over path edges that carry no group key —
    a planted-answer check of the same CC kernel `minhash_clusters` uses
    at scale.  Each round is one task-based bucket shuffle; no driver-
    resident edge list on the distributed path (reference has no graph
    ops; training-data-side extension alongside `pagerank`).

    Tiered like ``minhash_clusters``: below ``CC_DRIVER_MAX_PAIRS`` edges
    the vectorized in-memory ``min_label_propagation`` wins outright (the
    LS/SS rounds are pure task overhead on tiny inputs — measured 26 s vs
    ~1 s at 5k docs); pass ``distributed=True`` to force the rounds (the
    planted pytest does)."""
    from .dedup import CC_DRIVER_MAX_PAIRS, cc_clusters, min_label_propagation

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    rows = hash_groupby(docs, ["lang"], _lang_path_rows, num_partitions)
    rows = rows.materialize()  # tiny (one row per doc); consumed twice
    edges = rows.map_batches(_ccp_edges, batch_format="pyarrow")
    singles = rows.map_batches(_ccp_singles, batch_format="pyarrow")
    if distributed is None:
        distributed = edges.count() > CC_DRIVER_MAX_PAIRS
    if distributed:
        labeled = cc_clusters(edges, num_partitions).map_batches(
            _ccp_rename, batch_format="pyarrow"
        )
        return labeled.union(singles)
    et = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow")]
        + [pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()],
        promote_options="default",
    )
    members, rep = min_label_propagation(
        et["a"].to_numpy(zero_copy_only=False),
        et["b"].to_numpy(zero_copy_only=False),
    )
    lab = pa.table(
        {"doc_id": pa.array(members, pa.int64()),
         "component": pa.array(rep, pa.int64())}
    )
    return ray.data.from_arrow(lab).union(singles)


def connected_components_sql_oracle() -> str:
    return """
        SELECT doc_id,
               CAST(min(doc_id) OVER (PARTITION BY lang) AS BIGINT) AS component
        FROM documents
    """
