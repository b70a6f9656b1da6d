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


def _bucketed_order_graph(sf_dir: str, num_buckets: int):
    """Bucket the order-graph edge list once (it stays put for every
    iteration); returns (ebucket refs, node-table refs) or None if the
    graph is empty."""
    edges = _order_edges(sf_dir)
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
        return None
    ebuckets = [
        _edge_bucket.remote(*[pb[i] for pb in per_block])
        for i in range(num_buckets)
    ]
    nodes = [_bucket_nodes.remote(e) for e in ebuckets]
    return ebuckets, nodes


_PR_OUT_SCHEMA = pa.schema(
    [("node", pa.int64()), ("kind", pa.string()), ("rank_fp", pa.int64())]
)


def _pr_label(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _PR_OUT_SCHEMA.empty_table()
    n = t["node"].to_numpy(zero_copy_only=False)
    kind = np.where(n % 2 == 0, "customer", "supplier")
    return pa.table(
        {
            "node": t["node"],
            "kind": pa.array(kind.tolist(), pa.string()),
            "rank_fp": t["r"],
        }
    )


def pagerank(
    sf_dir: str, iters: int = 3, num_buckets: int = 32
) -> ray.data.Dataset:
    """Integer fixed-point PageRank over the customer<->supplier graph.

    Output: (node, kind, rank_fp) — rank_fp is the int64 fixed-point rank
    (multiples of 1/SCALE) after ``iters`` synchronous iterations; kind
    tags the bipartite side.  Bitwise deterministic at any parallelism.
    """
    g = _bucketed_order_graph(sf_dir, num_buckets)
    if g is None:
        return ray.data.from_arrow(_PR_OUT_SCHEMA.empty_table())
    ebuckets, nodes = g
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

    return ray.data.from_arrow_refs(ranks).map_batches(
        _pr_label, batch_format="pyarrow"
    )


# --------------------------------------- personalized PageRank ----

PPR_SEEDS = [2, 4, 6]  # customer nodes custkey 1..3 (node id = 2*custkey)


@ray.remote
def _ppr_init(nodes: pa.Table, seeds: np.ndarray, per_seed: int) -> pa.Table:
    n = nodes["node"].to_numpy(zero_copy_only=False)
    r = np.where(np.isin(n, seeds), np.int64(per_seed), np.int64(0))
    return pa.table({"node": nodes["node"], "r": pa.array(r, pa.int64())})


@ray.remote
def _ppr_gather(seed_base: int, seeds: np.ndarray, *parts: pa.Table) -> pa.Table:
    live = [p for p in parts if p.num_rows]
    if not live:
        return pa.schema([("node", pa.int64()), ("r", pa.int64())]).empty_table()
    t = pa.concat_tables(live, promote_options="default")
    dst = t["dst"].to_numpy(zero_copy_only=False)
    c = t["c"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(dst, return_inverse=True)
    s = np.where(np.isin(uniq, seeds), np.int64(seed_base), np.int64(0))
    np.add.at(s, inv, c)
    return pa.table(
        {"node": pa.array(uniq, pa.int64()), "r": pa.array(s, pa.int64())}
    )


def personalized_pagerank(
    sf_dir: str,
    iters: int = 3,
    num_buckets: int = 32,
    seeds: list[int] | None = None,
) -> ray.data.Dataset:
    """PERSONALIZED PageRank: identical integer fixed-point kernel to
    :func:`pagerank` (same bucketed scatter/gather, same exactness
    argument) but the teleport mass lands only on the ``seeds`` — r0 and
    the per-iteration base are SCALE//|S| and (15%·SCALE)//|S| on seed
    nodes, zero elsewhere — so rank_fp measures proximity to the seed
    set (the "related to these customers" relevance vector).  Output:
    (node, kind, rank_fp), nodes reachable with nonzero in-flow plus the
    seeds.  Bitwise deterministic at any parallelism.
    """
    seed_arr = np.asarray(sorted(seeds or PPR_SEEDS), dtype=np.int64)
    g = _bucketed_order_graph(sf_dir, num_buckets)
    if g is None:
        return ray.data.from_arrow(_PR_OUT_SCHEMA.empty_table())
    ebuckets, nodes = g
    per_seed = SCALE // len(seed_arr)
    seed_base = (15 * SCALE // 100) // len(seed_arr)
    seeds_ref = ray.put(seed_arr)
    ranks = [_ppr_init.remote(t, seeds_ref, per_seed) for t in nodes]
    for _ in range(iters):
        partials = [
            _pr_scatter.options(num_returns=num_buckets).remote(e, r, num_buckets)
            if num_buckets > 1
            else (_pr_scatter.remote(e, r, num_buckets),)
            for e, r in zip(ebuckets, ranks)
        ]
        ranks = [
            _ppr_gather.remote(seed_base, seeds_ref, *[p[i] for p in partials])
            for i in range(num_buckets)
        ]
    return ray.data.from_arrow_refs(ranks).map_batches(
        _pr_label, batch_format="pyarrow"
    )


def personalized_pagerank_sql_oracle(
    iters: int = 3, seeds: list[int] | None = None
) -> str:
    seed_list = ", ".join(str(s) for s in sorted(seeds or PPR_SEEDS))
    n_seeds = len(seeds or PPR_SEEDS)
    per_seed = SCALE // n_seeds
    seed_base = (15 * SCALE // 100) // n_seeds
    damp = f"* {DAMP_NUM} // {DAMP_DEN}"
    prev = "r0"
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
          SELECT e.dst AS node,
                 CAST(CASE WHEN e.dst IN ({seed_list})
                           THEN {seed_base} ELSE 0 END
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
        r0 AS (
          SELECT src AS node,
                 CAST(CASE WHEN src IN ({seed_list})
                           THEN {per_seed} ELSE 0 END AS BIGINT) AS r
          FROM deg
        ),
        {chain}
        SELECT node,
               CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               r AS rank_fp
        FROM {prev}
    """


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


# ---------------------------------------------------------------------------
# triangle counting over a band-join-derived customer graph
# ---------------------------------------------------------------------------

_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _expand_ranges(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Flat indices [lo0..hi0) ++ [lo1..hi1) ++ ... without a Python loop."""
    counts = hi - lo
    tot = int(counts.sum())
    if tot == 0:
        return np.empty(0, np.int64)
    starts = np.repeat(lo, counts)
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return starts + within


def _band_edges(sf_dir: str, window: int, num_partitions: int | None):
    """Distributed band self-join: undirected edges (a < b) between
    customers sharing (c_nationkey, c_mktsegment) with b - a <= window.

    The scale mechanism is range bucketing with one-sided replication:
    a pair (x, y) is owned by x's bucket ``x // R`` (R >= window), and a
    row y is replicated into the PREVIOUS bucket exactly when
    ``y mod R < window`` — so every pair meets in exactly one bucket and
    each row exists in at most two.  No global sort, no dedup pass."""
    R = max(window * 8, window + 1)

    def scatter(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = t["c_mktsegment"].to_numpy(zero_copy_only=False)
        b0 = ck // R
        carry = (ck - b0 * R) < window
        bkt = np.concatenate([b0, b0[carry] - 1])
        native = np.concatenate(
            [np.ones(len(ck), bool), np.zeros(int(carry.sum()), bool)]
        )
        idx = np.concatenate([np.arange(len(ck)), np.flatnonzero(carry)])
        return pa.table(
            {
                "bkt": pa.array(bkt, pa.int64()),
                "ck": pa.array(ck[idx], pa.int64()),
                "nk": pa.array(nk[idx], pa.int64()),
                "seg": pa.array(seg[idx], pa.string()),
                "native": pa.array(native),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EDGE_SCHEMA.empty_table()
        ck = t["ck"].to_numpy(zero_copy_only=False)
        nk = t["nk"].to_numpy(zero_copy_only=False)
        seg = t["seg"].to_numpy(zero_copy_only=False)
        bkt = t["bkt"].to_numpy(zero_copy_only=False)
        native = t["native"].to_numpy(zero_copy_only=False)
        if ck.max(initial=0) >= 1 << 30:
            raise ValueError("band key encoding assumes custkey < 2^30")
        _, seg_code = np.unique(seg, return_inverse=True)
        # (bkt, group, custkey) fused into one sortable int64 key; groups
        # are (nation, segment) so the group id is tiny.  bkt MUST be part
        # of the key: one hash partition can hold several distinct band
        # buckets, and a window must never cross them — a native row's
        # carried twin lives under a different bkt value, so pairing
        # across bkt double-counts every cross-bucket pair.
        gid = nk * np.int64(seg_code.max(initial=0) + 1) + seg_code
        _, grp = np.unique(bkt * np.int64(1 << 31) + gid, return_inverse=True)
        key = grp.astype(np.int64) * np.int64(1 << 31) + ck
        order = np.argsort(key, kind="stable")
        key_s, ck_s = key[order], ck[order]
        nat_keys = key[native]
        lo = np.searchsorted(key_s, nat_keys, side="right")
        hi = np.searchsorted(key_s, nat_keys + window, side="right")
        idx = _expand_ranges(lo, hi)
        counts = hi - lo
        a = np.repeat(ck[native], counts)
        b = ck_s[idx]
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    rows = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    ).map_batches(scatter, batch_format="pyarrow")
    return hash_groupby(rows, ["bkt"], pairs, num_partitions)


def triangle_count(
    sf_dir: str, window: int = 400, num_partitions: int | None = None
) -> pa.Table:
    """Per-node triangle counts: (c_custkey, deg, tri) over the band graph
    from :func:`_band_edges` — nodes with at least one edge.

    Degree-oriented wedge join (the MapReduce triangle algorithm of
    Suri & Vassilvitskii, WWW'11): orient every edge from its lower
    (degree, id) endpoint to the higher, emit the C(out-deg, 2) wedges
    per source, and close each wedge against the oriented edge list.
    Orientation bounds out-degree by O(sqrt(m)), so the wedge volume is
    O(m^1.5) worst case instead of sum(deg^2); every stage is a bucket
    shuffle (hash_groupby / hash_join), nothing sorts the raw stream.
    """
    edges = _band_edges(sf_dir, window, num_partitions)

    def endpoints(t: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                t["a"].to_numpy(zero_copy_only=False),
                t["b"].to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"v": pa.array(v, pa.int64())})

    def count_v(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("v", pa.int64()), ("deg", pa.int64())]).empty_table()
        v = t["v"].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(u, pa.int64()), "deg": pa.array(c.astype(np.int64))}
        )

    deg = hash_groupby(
        edges.map_batches(endpoints, batch_format="pyarrow"), ["v"], count_v,
        num_partitions,
    )

    # orient: join degree onto both endpoints (two bucket shuffles over the
    # edge list — deg is per-node and can be huge at scale, so no broadcast)
    ea = hash_join(
        edges,
        deg.map_batches(
            lambda t: t.rename_columns(["a", "deg_a"]), batch_format="pyarrow"
        ),
        on="a",
    )
    eab = hash_join(
        ea,
        deg.map_batches(
            lambda t: t.rename_columns(["b", "deg_b"]), batch_format="pyarrow"
        ),
        on="b",
    )

    def orient(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("dkey", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddeg = np.where(a_first, db, da)
        if ddeg.max(initial=0) >= 1 << 32 or dst.max(initial=0) >= 1 << 30:
            raise ValueError("dkey encoding assumes deg < 2^32, id < 2^30")
        dkey = ddeg * np.int64(1 << 30) + dst
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "dkey": pa.array(dkey, pa.int64()),
            }
        )

    oriented = eab.map_batches(orient, batch_format="pyarrow")

    def wedges(t: pa.Table) -> pa.Table:
        schema = pa.schema([("kk", pa.int64()), ("apex", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        dkey = t["dkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dkey, src))
        src_s, dst_s = src[order], dst[order]
        new = np.concatenate([[True], src_s[1:] != src_s[:-1]])
        grp_end = np.append(np.flatnonzero(new)[1:], len(src_s))
        ends = np.repeat(grp_end, np.diff(np.append(np.flatnonzero(new), len(src_s))))
        pos = np.arange(len(src_s), dtype=np.int64)
        idx = _expand_ranges(pos + 1, ends)
        counts = ends - pos - 1
        v = np.repeat(dst_s, counts)
        w = dst_s[idx]
        apex = np.repeat(src_s, counts)
        kk = v * np.int64(1 << 30) + w
        return pa.table(
            {"kk": pa.array(kk, pa.int64()), "apex": pa.array(apex, pa.int64())}
        )

    # per-src wedge expansion needs every out-edge of a src together
    wedge_ds = hash_groupby(oriented, ["src"], wedges, num_partitions)
    def edge_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kk": pa.array(
                    t["src"].to_numpy(zero_copy_only=False) * np.int64(1 << 30)
                    + t["dst"].to_numpy(zero_copy_only=False),
                    pa.int64(),
                ),
                "hit": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    edge_keys = oriented.map_batches(edge_key, batch_format="pyarrow")
    closed = hash_join(wedge_ds, edge_keys, on="kk")

    def tri_endpoints(t: pa.Table) -> pa.Table:
        kk = t["kk"].to_numpy(zero_copy_only=False)
        apex = t["apex"].to_numpy(zero_copy_only=False)
        v = kk >> np.int64(30)
        w = kk & np.int64((1 << 30) - 1)
        return pa.table({"v": pa.array(np.concatenate([apex, v, w]), pa.int64())})

    def count_tri(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("v", pa.int64()), ("tri", pa.int64())]).empty_table()
        v = t["v"].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(u, pa.int64()), "tri": pa.array(c.astype(np.int64))}
        )

    tcnt = hash_groupby(
        closed.map_batches(tri_endpoints, batch_format="pyarrow"),
        ["v"],
        count_tri,
        num_partitions,
    )
    out = hash_join(deg, tcnt, on="v", how="left outer").to_pandas()
    out["tri"] = out["tri"].fillna(0).astype("int64")
    out = out.sort_values("v").reset_index(drop=True)
    out = out.rename(columns={"v": "c_custkey"})
    return pa.Table.from_pandas(out[["c_custkey", "deg", "tri"]], preserve_index=False)


def triangle_count_sql_oracle(window: int = 400) -> str:
    return f"""
        WITH c AS (
          SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg
          FROM customer
        ),
        edges AS (
          SELECT x.ck AS a, y.ck AS b
          FROM c x JOIN c y
            ON x.nk = y.nk AND x.seg = y.seg
           AND y.ck > x.ck AND y.ck <= x.ck + {window}
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM edges e1
          JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
        ),
        p AS (
          SELECT x AS v FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        ),
        t AS (SELECT v, count(*) AS tri FROM p GROUP BY v),
        d AS (
          SELECT v, CAST(count(*) AS BIGINT) AS deg
          FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges)
          GROUP BY v
        )
        SELECT d.v AS c_custkey, d.deg,
               CAST(COALESCE(t.tri, 0) AS BIGINT) AS tri
        FROM d LEFT JOIN t ON t.v = d.v
    """


# --------------------------------------------------- multi-source BFS ----

BFS_SEEDS = [2, 4, 6]  # customer nodes custkey 1..3 (node id = 2*custkey)
BFS_MAX_HOPS = 4


@ray.remote
def _bfs_scatter(edges: pa.Table, frontier: pa.Table, nparts: int):
    """One src-bucket's frontier expansion: every out-edge of a frontier
    node emits its dst, pre-deduped (the combiner), split by hash(dst).
    Frontier buckets share the edge buckets' hash(src) keying, so the
    vectorized searchsorted range join never leaves the task."""
    empty = pa.schema([("node", pa.int64())]).empty_table()
    if edges.num_rows == 0 or frontier.num_rows == 0:
        return tuple(empty for _ in range(nparts)) if nparts > 1 else empty
    src = edges["src"].to_numpy(zero_copy_only=False)
    dst = edges["dst"].to_numpy(zero_copy_only=False)
    f = frontier["node"].to_numpy(zero_copy_only=False)
    lo = np.searchsorted(src, f, side="left")
    hi = np.searchsorted(src, f, side="right")
    cand = np.unique(dst[_expand_ranges(lo, hi)])
    b = _knuth_bucket(cand, nparts)
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nparts + 1))
    out = tuple(
        pa.table(
            {"node": pa.array(cand[order[bounds[i] : bounds[i + 1]]], pa.int64())}
        )
        for i in range(nparts)
    )
    return out if nparts > 1 else out[0]


@ray.remote(num_returns=2)
def _bfs_gather(visited: pa.Table, hop: int, *parts: pa.Table):
    """Min-combine one node-bucket's incoming candidates: drop nodes seen
    at an earlier level (their recorded dist is already minimal — BFS is
    level-synchronous), stamp the rest with ``hop``.  Returns
    (visited', next frontier)."""
    fr_empty = pa.schema([("node", pa.int64())]).empty_table()
    live = [p for p in parts if p.num_rows]
    if not live:
        return visited, fr_empty
    cand = np.unique(
        np.concatenate([p["node"].to_numpy(zero_copy_only=False) for p in live])
    )
    seen = visited["node"].to_numpy(zero_copy_only=False)
    new = cand[~np.isin(cand, seen)]
    if len(new) == 0:
        return visited, fr_empty
    add = pa.table(
        {
            "node": pa.array(new, pa.int64()),
            "dist": pa.array(np.full(len(new), hop, dtype=np.int64), pa.int64()),
        }
    )
    return (
        pa.concat_tables([visited, add]),
        pa.table({"node": pa.array(new, pa.int64())}),
    )


def _bfs_label(t: pa.Table) -> pa.Table:
    out_schema = pa.schema(
        [("node", pa.int64()), ("kind", pa.string()), ("dist", pa.int64())]
    )
    if t.num_rows == 0:
        return out_schema.empty_table()
    n = t["node"].to_numpy(zero_copy_only=False)
    kind = np.where(n % 2 == 0, "customer", "supplier")
    return pa.table(
        {"node": t["node"], "kind": pa.array(kind.tolist(), pa.string()), "dist": t["dist"]}
    )


def bfs_hops(
    sf_dir: str,
    seeds: list[int] | None = None,
    max_hops: int = BFS_MAX_HOPS,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Multi-source BFS hop distance over the customer<->supplier graph:
    (node, kind, dist) for every node within ``max_hops`` of a seed, dist
    = exact minimum hop count (int64, hash-comparable).

    Level-synchronous Pregel/BSP frontier expansion over the SAME
    hash(src)-bucketed resident edge list PageRank uses: per level, one
    scatter task per bucket (searchsorted range join, pre-dedup, hash(dst)
    fan-out) and one gather per node bucket (drop visited, stamp level).
    Per level the only bytes crossing the object store are the deduped
    frontier candidates — O(frontier), never O(edges).  Fixed ``max_hops``
    levels; an exhausted frontier makes later levels metadata-only no-ops.

    Seeds default to customers 1..3 (training-data use: label propagation
    radius from trusted seed documents — crawl-depth/quality tiers)."""
    sarr = np.unique(np.asarray(seeds if seeds is not None else BFS_SEEDS, np.int64))
    edges = _order_edges(sf_dir)

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
        return ray.data.from_arrow(
            _bfs_label(
                pa.table(
                    {
                        "node": pa.array(sarr, pa.int64()),
                        "dist": pa.array(np.zeros(len(sarr), np.int64), pa.int64()),
                    }
                )
            )
        )
    ebuckets = [
        _edge_bucket.remote(*[pb[i] for pb in per_block])
        for i in range(num_buckets)
    ]

    sb = _knuth_bucket(sarr, num_buckets)
    visited, frontier = [], []
    for i in range(num_buckets):
        mine = sarr[sb == i]
        visited.append(
            ray.put(
                pa.table(
                    {
                        "node": pa.array(mine, pa.int64()),
                        "dist": pa.array(np.zeros(len(mine), np.int64), pa.int64()),
                    }
                )
            )
        )
        frontier.append(ray.put(pa.table({"node": pa.array(mine, pa.int64())})))

    for hop in range(1, max_hops + 1):
        partials = [
            _bfs_scatter.options(num_returns=num_buckets).remote(e, f, num_buckets)
            if num_buckets > 1
            else (_bfs_scatter.remote(e, f, num_buckets),)
            for e, f in zip(ebuckets, frontier)
        ]
        rounds = [
            _bfs_gather.remote(visited[i], hop, *[p[i] for p in partials])
            for i in range(num_buckets)
        ]
        visited = [r[0] for r in rounds]
        frontier = [r[1] for r in rounds]

    return ray.data.from_arrow_refs(visited).map_batches(
        _bfs_label, batch_format="pyarrow"
    )


def bfs_hops_sql_oracle(max_hops: int = BFS_MAX_HOPS) -> str:
    seeds = ", ".join(f"({s})" for s in BFS_SEEDS)
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        edges AS (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b AS src, a AS dst FROM pairs
        ),
        seeds(node) AS (VALUES {seeds}),
        walk(node, dist) AS (
          SELECT node, 0 FROM seeds
          UNION
          SELECT e.dst, w.dist + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.dist < {max_hops}
        )
        SELECT node,
               CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               CAST(min(dist) AS BIGINT) AS dist
        FROM walk GROUP BY node
    """


# ----------------------------------------------------- label propagation --

LP_SEEDS = {2: 1, 4: 2, 6: 3}  # customer nodes 1..3 -> label tiers
LP_ROUNDS = 3


@ray.remote
def _lp_scatter(edges: pa.Table, frontier: pa.Table, nparts: int):
    """One src-bucket's vote scatter: every out-edge of a last-round-
    labeled node emits (dst, label), pre-aggregated to (dst, label,
    votes) before the hash(dst) fan-out.  Frontier-only voting is EXACT:
    an unlabeled dst cannot have a neighbor labeled before the last
    round (it would have been labeled then itself), so the frontier IS
    its whole labeled neighborhood."""
    empty = pa.schema(
        [("node", pa.int64()), ("label", pa.int64()), ("votes", pa.int64())]
    ).empty_table()
    if edges.num_rows == 0 or frontier.num_rows == 0:
        return tuple(empty for _ in range(nparts)) if nparts > 1 else empty
    src = edges["src"].to_numpy(zero_copy_only=False)
    dst = edges["dst"].to_numpy(zero_copy_only=False)
    f = frontier["node"].to_numpy(zero_copy_only=False)
    fl = frontier["label"].to_numpy(zero_copy_only=False)
    lo = np.searchsorted(src, f, side="left")
    hi = np.searchsorted(src, f, side="right")
    idx = _expand_ranges(lo, hi)
    if len(idx) == 0:
        return tuple(empty for _ in range(nparts)) if nparts > 1 else empty
    vd = dst[idx]
    vl = np.repeat(fl, hi - lo)
    # pre-aggregate (dst, label) votes — the combiner
    key = vd * np.int64(1 << 20) + vl  # labels are tiny ints
    uk, inv = np.unique(key, return_inverse=True)
    votes = np.bincount(inv).astype(np.int64)
    ud = (uk >> np.int64(20)).astype(np.int64)
    ul = (uk & np.int64((1 << 20) - 1)).astype(np.int64)
    b = _knuth_bucket(ud, nparts)
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nparts + 1))
    out = tuple(
        pa.table(
            {
                "node": pa.array(ud[order[bounds[i] : bounds[i + 1]]], pa.int64()),
                "label": pa.array(ul[order[bounds[i] : bounds[i + 1]]], pa.int64()),
                "votes": pa.array(votes[order[bounds[i] : bounds[i + 1]]], pa.int64()),
            }
        )
        for i in range(nparts)
    )
    return out if nparts > 1 else out[0]


@ray.remote(num_returns=2)
def _lp_gather(labeled: pa.Table, *parts: pa.Table):
    """Majority election per newly-reached node in one node bucket:
    already-labeled nodes are clamped (hard seeds); the rest adopt the
    label with the most votes, tie -> smallest label.  Returns
    (labeled', new frontier)."""
    fr_empty = pa.schema(
        [("node", pa.int64()), ("label", pa.int64())]
    ).empty_table()
    live = [p for p in parts if p.num_rows]
    if not live:
        return labeled, fr_empty
    t = pa.concat_tables(live, promote_options="default")
    node = t["node"].to_numpy(zero_copy_only=False)
    lab = t["label"].to_numpy(zero_copy_only=False)
    votes = t["votes"].to_numpy(zero_copy_only=False)
    seen = labeled["node"].to_numpy(zero_copy_only=False)
    new_mask = ~np.isin(node, seen)
    node, lab, votes = node[new_mask], lab[new_mask], votes[new_mask]
    if len(node) == 0:
        return labeled, fr_empty
    # sum votes across shards for the same (node, label)
    key = node * np.int64(1 << 20) + lab
    uk, inv = np.unique(key, return_inverse=True)
    v = np.zeros(len(uk), dtype=np.int64)
    np.add.at(v, inv, votes)
    un = (uk >> np.int64(20)).astype(np.int64)
    ul = (uk & np.int64((1 << 20) - 1)).astype(np.int64)
    # majority with (votes DESC, label ASC): sort by (node, -votes, label)
    order = np.lexsort((ul, -v, un))
    un_s = un[order]
    first = np.ones(len(un_s), dtype=bool)
    first[1:] = un_s[1:] != un_s[:-1]
    win = order[first]
    add = pa.table(
        {
            "node": pa.array(un[win], pa.int64()),
            "label": pa.array(ul[win], pa.int64()),
        }
    )
    return pa.concat_tables([labeled, add]), add


def label_propagation(
    sf_dir: str,
    seeds: dict[int, int] | None = None,
    rounds: int = LP_ROUNDS,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Semi-supervised label propagation over the customer<->supplier
    graph (hard-clamped seeds): each round, unlabeled nodes adjacent to
    the last round's newly-labeled frontier adopt the majority neighbor
    label (votes DESC, label ASC tie-break) — the quality-tier /
    trust-propagation primitive for crawl corpora.  Bucketed
    scatter/gather over PageRank's resident edge list (frontier-only
    voting, provably equal to voting from the full labeled set).
    Integer labels, bitwise deterministic at any parallelism.  Output
    (node, kind, label) for every node labeled within ``rounds``."""
    sd = dict(seeds) if seeds is not None else dict(LP_SEEDS)
    if any(l < 0 or l >= (1 << 20) for l in sd.values()):
        raise ValueError("labels must fit in 20 bits (packed vote keys)")
    edges = _order_edges(sf_dir)
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
    sarr = np.array(sorted(sd), dtype=np.int64)
    larr = np.array([sd[int(n)] for n in sarr], dtype=np.int64)

    def label_out(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("node", pa.int64()), ("kind", pa.string()), ("label", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t["node"].to_numpy(zero_copy_only=False)
        kind = np.where(n % 2 == 0, "customer", "supplier")
        return pa.table(
            {
                "node": t["node"],
                "kind": pa.array(kind.tolist(), pa.string()),
                "label": t["label"],
            }
        )

    if not per_block:
        return ray.data.from_arrow(
            label_out(
                pa.table(
                    {"node": pa.array(sarr), "label": pa.array(larr)}
                )
            )
        )
    ebuckets = [
        _edge_bucket.remote(*[pb[i] for pb in per_block])
        for i in range(num_buckets)
    ]
    sb = _knuth_bucket(sarr, num_buckets)
    labeled, frontier = [], []
    for i in range(num_buckets):
        mine = sb == i
        t = pa.table(
            {
                "node": pa.array(sarr[mine], pa.int64()),
                "label": pa.array(larr[mine], pa.int64()),
            }
        )
        labeled.append(ray.put(t))
        frontier.append(ray.put(t))
    for _ in range(rounds):
        partials = [
            _lp_scatter.options(num_returns=num_buckets).remote(e, f, num_buckets)
            if num_buckets > 1
            else (_lp_scatter.remote(e, f, num_buckets),)
            for e, f in zip(ebuckets, frontier)
        ]
        rounds_out = [
            _lp_gather.remote(labeled[i], *[p[i] for p in partials])
            for i in range(num_buckets)
        ]
        labeled = [r[0] for r in rounds_out]
        frontier = [r[1] for r in rounds_out]
    return ray.data.from_arrow_refs(labeled).map_batches(
        label_out, batch_format="pyarrow"
    )


def label_propagation_sql_oracle(rounds: int = LP_ROUNDS) -> str:
    seeds = ", ".join(f"({n}, {l})" for n, l in sorted(LP_SEEDS.items()))
    prev = "l0"
    steps = []
    for i in range(1, rounds + 1):
        steps.append(
            f"""l{i} AS (
          SELECT node, label FROM {prev}
          UNION ALL
          SELECT node, label FROM (
            SELECT e.dst AS node, p.label,
                   row_number() OVER (
                     PARTITION BY e.dst
                     ORDER BY count(*) DESC, p.label ASC
                   ) AS r
            FROM edges e JOIN {prev} p ON p.node = e.src
            WHERE e.dst NOT IN (SELECT node FROM {prev})
            GROUP BY e.dst, p.label
          ) WHERE r = 1
        )"""
        )
        prev = f"l{i}"
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
        l0(node, label) AS (VALUES {seeds}),
        {chain}
        SELECT node,
               CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
               CAST(label AS BIGINT) AS label
        FROM {prev}
    """


# ------------------------------------- Adamic-Adar link prediction ----

AA_WINDOW = 20
AA_TOPK = 30


def adamic_adar(
    sf_dir: str,
    window: int = AA_WINDOW,
    k: int = AA_TOPK,
    num_partitions: int | None = None,
) -> pa.Table:
    """Adamic-Adar link prediction over the band graph of
    :func:`_band_edges`: for every NON-adjacent pair (a, b) with at least
    one common neighbor, AA(a,b) = sum over common neighbors z of
    1/ln(deg(z)); returns the top-k pairs as (rank, a, b, aa_e9).

    Exactness: each wedge contributes the INTEGER weight
    floor(1e9/ln(deg(z)) + 0.5), so pair scores are order-independent
    int64 sums that hash-compare against the SQL oracle (duckdb ln() and
    numpy log are the same libm double op on integer degrees).

    Distribution shape: adjacency rows (z, x) are bucketed by z
    (``hash_groupby``) so each z's full neighbor list is co-located —
    deg(z) is simply the group size; wedges are emitted vectorized with
    per-group weights and pre-summed per (a, b) inside the task; a second
    bucket groupby finishes the pair sums; adjacency is removed with a
    bucketed LEFT OUTER ``hash_join`` on the fused pair key (no broadcast
    of the edge list); per-batch local top-k candidates merge on the
    driver (k x batches rows, tiny).
    """
    edges = _band_edges(sf_dir, window, num_partitions)

    def adj(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "z": pa.array(np.concatenate([a, b]), pa.int64()),
                "x": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    pair_schema = pa.schema([("kk", pa.int64()), ("w_part", pa.int64())])

    def wedges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        z = t["z"].to_numpy(zero_copy_only=False)
        x = t["x"].to_numpy(zero_copy_only=False)
        order = np.lexsort((x, z))
        z_s, x_s = z[order], x[order]
        new = np.concatenate([[True], z_s[1:] != z_s[:-1]])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(z_s))
        m = ends - starts  # deg(z): the full neighbor count, co-located here
        w_g = np.zeros(len(m), np.int64)
        big = m >= 2
        w_g[big] = np.floor(1e9 / np.log(m[big]) + 0.5).astype(np.int64)
        # all C(m, 2) neighbor pairs per z, vectorized; x_s is sorted
        # within each z-run so a < b by construction
        pos = np.arange(len(z_s), dtype=np.int64)
        grp_end = np.repeat(ends, m)
        idx = _expand_ranges(pos + 1, grp_end)
        counts = grp_end - pos - 1
        a = np.repeat(x_s, counts)
        b = x_s[idx]
        w = np.repeat(np.repeat(w_g, m), counts)
        if len(b) and b.max() >= 1 << 30:
            raise ValueError("pair key encoding assumes id < 2^30")
        kk = a * np.int64(1 << 30) + b
        u, inv = np.unique(kk, return_inverse=True)
        return pa.table(
            {
                "kk": pa.array(u, pa.int64()),
                "w_part": pa.array(np.bincount(inv, weights=w).astype(np.int64)),
            }
        )

    def sum_pairs(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([("kk", pa.int64()), ("aa_e9", pa.int64())])
        if t.num_rows == 0:
            return out_schema.empty_table()
        kk = t["kk"].to_numpy(zero_copy_only=False)
        w = t["w_part"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(kk, return_inverse=True)
        return pa.table(
            {
                "kk": pa.array(u, pa.int64()),
                "aa_e9": pa.array(np.bincount(inv, weights=w).astype(np.int64)),
            }
        )

    adjacency = edges.map_batches(adj, batch_format="pyarrow")
    pair_parts = hash_groupby(adjacency, ["z"], wedges, num_partitions)
    aa = hash_groupby(pair_parts, ["kk"], sum_pairs, num_partitions)

    def edge_key(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        if len(b) and b.max() >= 1 << 30:
            raise ValueError("pair key encoding assumes id < 2^30")
        return pa.table(
            {
                "kk": pa.array(a * np.int64(1 << 30) + b, pa.int64()),
                "hit": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    joined = hash_join(
        aa, edges.map_batches(edge_key, batch_format="pyarrow"),
        on="kk", how="left outer",
    )

    cand_schema = pa.schema([("kk", pa.int64()), ("aa_e9", pa.int64())])

    def local_topk(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.is_null(t["hit"]))
        if keep.num_rows == 0:
            return cand_schema.empty_table()
        kk = keep["kk"].to_numpy(zero_copy_only=False)
        s = keep["aa_e9"].to_numpy(zero_copy_only=False)
        order = np.lexsort((kk, -s))[:k]
        return pa.table(
            {
                "kk": pa.array(kk[order], pa.int64()),
                "aa_e9": pa.array(s[order], pa.int64()),
            }
        )

    cand = joined.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    kk = cand["kk"].to_numpy()
    s = cand["aa_e9"].to_numpy()
    order = np.lexsort((kk, -s))[:k]
    kk, s = kk[order], s[order]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(kk) + 1, dtype=np.int64)),
            "a": pa.array(kk >> np.int64(30), pa.int64()),
            "b": pa.array(kk & np.int64((1 << 30) - 1), pa.int64()),
            "aa_e9": pa.array(s, pa.int64()),
        }
    )


def adamic_adar_sql_oracle(window: int = AA_WINDOW, k: int = AA_TOPK) -> str:
    return f"""
        WITH c AS (
          SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg
          FROM customer
        ),
        edges AS (
          SELECT x.ck AS a, y.ck AS b
          FROM c x JOIN c y
            ON x.nk = y.nk AND x.seg = y.seg
           AND y.ck > x.ck AND y.ck <= x.ck + {window}
        ),
        nbr AS (
          SELECT a AS z, b AS x FROM edges
          UNION ALL SELECT b AS z, a AS x FROM edges
        ),
        d AS (SELECT z, count(*) AS deg FROM nbr GROUP BY z),
        w AS (
          SELECT z, CAST(floor(1e9 / ln(deg) + 0.5) AS BIGINT) AS w
          FROM d WHERE deg >= 2
        ),
        wedge AS (
          SELECT n1.x AS a, n2.x AS b, w.w
          FROM nbr n1
          JOIN nbr n2 ON n2.z = n1.z AND n2.x > n1.x
          JOIN w ON w.z = n1.z
        ),
        aa AS (
          SELECT a, b, CAST(sum(w) AS BIGINT) AS aa_e9 FROM wedge GROUP BY a, b
        ),
        na AS (
          SELECT aa.* FROM aa
          LEFT JOIN edges e ON e.a = aa.a AND e.b = aa.b
          WHERE e.a IS NULL
        )
        SELECT rank, a, b, aa_e9 FROM (
          SELECT a, b, aa_e9,
                 CAST(row_number() OVER (ORDER BY aa_e9 DESC, a, b) AS BIGINT) AS rank
          FROM na
        ) WHERE rank <= {k}
    """


# ------------------------------------------------------- k-core ----

K_CORE_K = 3
K_CORE_WINDOW = 200


@ray.remote
def _kcore_bucket_adj(*parts: pa.Table) -> pa.Table:
    live = [p for p in parts if p.num_rows]
    if not live:
        return pa.schema([("z", pa.int64()), ("x", pa.int64())]).empty_table()
    return pa.concat_tables(live, promote_options="default")


@ray.remote
def _kcore_counts(adj: pa.Table) -> pa.Table:
    """Survivor degrees for one bucket: z is hash-co-located, so a local
    unique+count IS the node's exact core degree; the driver gathers only
    these small (node, deg) tables, never the adjacency."""
    if adj.num_rows == 0:
        return pa.schema(
            [("node", pa.int64()), ("deg_in_core", pa.int64())]
        ).empty_table()
    z = adj["z"].to_numpy(zero_copy_only=False)
    u, c = np.unique(z, return_counts=True)
    return pa.table(
        {
            "node": pa.array(u, pa.int64()),
            "deg_in_core": pa.array(c.astype(np.int64)),
        }
    )


@ray.remote
def _kcore_peel(adj: pa.Table, removed: np.ndarray, k: int):
    """One delta-peel round for one bucket: drop removed neighbors from
    the co-located adjacency, return (new adjacency, newly-sub-k nodes).
    Nodes already below k are fully removed from the adjacency so they
    are reported exactly once."""
    empty = pa.schema([("z", pa.int64()), ("x", pa.int64())]).empty_table()
    if adj.num_rows == 0:
        return empty, np.empty(0, np.int64)
    z = adj["z"].to_numpy(zero_copy_only=False)
    x = adj["x"].to_numpy(zero_copy_only=False)
    if len(removed):
        keep = ~np.isin(x, removed)
        z, x = z[keep], x[keep]
    if len(z) == 0:
        return empty, np.unique(adj["z"].to_numpy(zero_copy_only=False))
    u, counts = np.unique(z, return_counts=True)
    dead = u[counts < k]
    # nodes whose rows vanished entirely this round are also dead
    gone = np.setdiff1d(
        np.unique(adj["z"].to_numpy(zero_copy_only=False)), u
    )
    dead = np.union1d(dead, gone)
    if len(dead):
        keep = ~np.isin(z, dead)
        z, x = z[keep], x[keep]
    return (
        pa.table({"z": pa.array(z, pa.int64()), "x": pa.array(x, pa.int64())}),
        dead,
    )


def k_core(
    sf_dir: str,
    k: int = K_CORE_K,
    window: int = K_CORE_WINDOW,
    num_buckets: int = 16,
) -> pa.Table:
    """k-CORE decomposition (membership for one k) over the band graph of
    :func:`_band_edges`: iteratively peel nodes with fewer than k
    surviving neighbors until fixpoint; (node, deg_in_core) for the
    survivors, deg_in_core = the node's degree inside the core.

    Distribution shape — DELTA peeling: adjacency rows (z, x) are
    bucketed by hash(z) ONCE and stay in the object store; each round
    broadcasts only the nodes removed LAST round (the frontier, small by
    definition), each bucket drops those neighbors, recomputes its local
    degrees (the full neighbor list of z is co-located) and reports the
    newly sub-k nodes.  Rounds = peeling depth; per round the driver
    moves O(frontier) ids, never the graph (the peeled adjacency is
    chained bucket-to-bucket as ObjectRefs via ``num_returns=2``; the
    driver gathers only the frontier arrays and, at the end, the small
    per-bucket (node, deg) tables).  SQL oracle: fixed-round synchronous
    peel replay (:func:`k_core_sql_oracle`, 12 unrolled rounds — measured
    fixpoint depth 5 at sf0.01); also pinned by the planted-graph pytest
    against a reference python peel.
    """
    edges = _band_edges(sf_dir, window, None)

    def adj(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "z": pa.array(np.concatenate([a, b]), pa.int64()),
                "x": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    adjacency = edges.map_batches(adj, batch_format="pyarrow")

    # bucket once by hash(z); rows of one z always land together
    per_block = []
    for bundle in adjacency.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            per_block.append(
                _hgsplit_kcore.options(num_returns=num_buckets).remote(
                    bref, num_buckets
                )
            )
    if not per_block:
        return pa.schema(
            [("node", pa.int64()), ("deg_in_core", pa.int64())]
        ).empty_table()
    buckets = [
        _kcore_bucket_adj.remote(*[pb[i] for pb in per_block])
        for i in range(num_buckets)
    ]
    removed = np.empty(0, np.int64)
    while True:
        rem_ref = ray.put(removed)
        # num_returns=2: the (large) peeled adjacency stays in the object
        # store as a ref chained straight into the next round; the driver
        # only ever ray.get's the (small) per-round frontier arrays.
        outs = [
            _kcore_peel.options(num_returns=2).remote(bkt, rem_ref, k)
            for bkt in buckets
        ]
        buckets = [adj_ref for adj_ref, _ in outs]
        dead = ray.get([dead_ref for _, dead_ref in outs])
        removed = (
            np.concatenate(dead)
            if any(len(d) for d in dead)
            else np.empty(0, np.int64)
        )
        if len(removed) == 0:
            break
    rows = ray.get([_kcore_counts.remote(b) for b in buckets])
    t = pa.concat_tables(rows)
    if t.num_rows == 0:
        return pa.schema(
            [("node", pa.int64()), ("deg_in_core", pa.int64())]
        ).empty_table()
    return t.sort_by("node")


def k_core_sql_oracle(
    k: int = K_CORE_K, window: int = K_CORE_WINDOW, rounds: int = 12
) -> str:
    """Fixed-round synchronous-peel replay of :func:`k_core` (the
    ``bfs_hops_sql_oracle`` fixed-iteration pattern): each unrolled round
    keeps exactly the edges whose BOTH endpoints still have degree >= k,
    which is one synchronous peel step.  ``rounds`` must be >= the peel
    fixpoint depth at the checked scale (measured: 1 at sf0.001, 5 at
    sf0.01; 12 leaves >2x margin) — beyond the fixpoint every extra round
    is the identity, so overshoot is safe, and a trailing convergence
    guard returns 0 rows (loud mismatch) if the depth ever exceeds
    ``rounds`` instead of silently blessing a superset."""
    # every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    # round references the previous one 3x -- inlined, e{rounds} would
    # expand to 3^rounds scans of the base table.
    parts = [
        """
        WITH c AS MATERIALIZED (
          SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg
          FROM customer
        ),
        p AS MATERIALIZED (
          SELECT x.ck AS a, y.ck AS b
          FROM c x JOIN c y
            ON x.nk = y.nk AND x.seg = y.seg
           AND y.ck > x.ck AND y.ck <= x.ck + {window}
        ),
        e0 AS MATERIALIZED (
          SELECT a AS z, b AS x FROM p UNION ALL SELECT b, a FROM p)
        """.format(window=window)
    ]
    for i in range(rounds):
        parts.append(
            """,
        d{i} AS MATERIALIZED (
          SELECT z FROM e{i} GROUP BY z HAVING count(*) >= {k}),
        e{j} AS MATERIALIZED (
          SELECT e.z, e.x FROM e{i} e
          JOIN d{i} u ON e.z = u.z
          JOIN d{i} v ON e.x = v.z
        )""".format(i=i, j=i + 1, k=k)
        )
    # convergence guard: peeling only removes rows (e{r} subset of
    # e{r-1}), so count equality at the end IS set equality; if the depth
    # ever exceeded `rounds`, this returns 0 rows — a loud driver
    # mismatch instead of a silent superset masquerading as the core.
    parts.append(
        """
        SELECT z AS node, CAST(count(*) AS BIGINT) AS deg_in_core
        FROM e{r}
        WHERE (SELECT count(*) FROM e{p}) = (SELECT count(*) FROM e{r})
        GROUP BY z ORDER BY node
        """.format(r=rounds, p=rounds - 1)
    )
    return "".join(parts)


@ray.remote
def _hgsplit_kcore(block, nparts: int):
    """Split one adjacency block into hash(z) buckets (num_returns fan-out)."""
    t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    if t.num_rows == 0 or "z" not in t.column_names:
        # empty upstream buckets arrive as schema-less 0-row tables
        e = pa.schema([("z", pa.int64()), ("x", pa.int64())]).empty_table()
        return tuple(e for _ in range(nparts)) if nparts > 1 else e
    z = t["z"].to_numpy(zero_copy_only=False)
    b = _knuth_bucket(z, nparts)
    order = np.argsort(b, kind="stable")
    bounds = np.searchsorted(b[order], np.arange(nparts + 1))
    out = tuple(
        t.take(pa.array(order[bounds[i] : bounds[i + 1]]))
        for i in range(nparts)
    )
    return out if nparts > 1 else out[0]
