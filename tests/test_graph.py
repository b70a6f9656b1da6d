"""Integer fixed-point PageRank: planted-graph exactness vs an in-memory
reference, and bitwise invariance across bucket counts."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from index_ray.pipelines.graph import SCALE, pagerank


def _write_graph(tmp_path, pairs):
    """pairs: (custkey, suppkey) lineitem-linked pairs (dups allowed)."""
    d = tmp_path / "g"
    d.mkdir()
    okeys = list(range(len(pairs)))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys, pa.int64()),
                "o_custkey": pa.array([c for c, _ in pairs], pa.int64()),
            }
        ),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    return str(d)


def _reference_pagerank(pairs, iters=3):
    uniq = sorted({(c * 2, s * 2 + 1) for c, s in pairs})
    edges = [(a, b) for a, b in uniq] + [(b, a) for a, b in uniq]
    nodes = sorted({u for u, _ in edges})
    deg = {u: 0 for u in nodes}
    for u, _ in edges:
        deg[u] += 1
    n = len(nodes)
    base = (15 * SCALE // 100) // n
    r = {u: SCALE // n for u in nodes}
    for _ in range(iters):
        nxt = {u: base for u in nodes}
        for u, v in edges:
            nxt[v] += (r[u] * 85 // 100) // deg[u]
        r = nxt
    return r


def test_pagerank_planted_graph(ray_session, tmp_path):
    # two communities sharing one bridge supplier, plus duplicate pairs
    # (the DISTINCT must collapse them)
    pairs = [
        (1, 1), (1, 1), (2, 1), (3, 1),   # supplier 1 is a hub
        (4, 2), (5, 2),
        (3, 2),                            # bridge
        (6, 3),                            # leaf pair
    ]
    d = _write_graph(tmp_path, pairs)
    out = pagerank(d, iters=3, num_buckets=4).to_pandas()
    want = _reference_pagerank(pairs, iters=3)
    got = dict(zip(out["node"], out["rank_fp"]))
    assert got == want
    kinds = dict(zip(out["node"], out["kind"]))
    assert all(
        kinds[u] == ("customer" if u % 2 == 0 else "supplier") for u in got
    )
    # the hub supplier outranks every leaf supplier
    assert got[1 * 2 + 1] > got[3 * 2 + 1]


def test_pagerank_bucket_invariance(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    pairs = [
        (int(c), int(s))
        for c, s in zip(rng.integers(1, 40, 300), rng.integers(1, 12, 300))
    ]
    d = _write_graph(tmp_path, pairs)
    a = pagerank(d, iters=3, num_buckets=1).to_pandas().sort_values("node")
    b = pagerank(d, iters=3, num_buckets=16).to_pandas().sort_values("node")
    assert a["rank_fp"].tolist() == b["rank_fp"].tolist()
    assert a["node"].tolist() == b["node"].tolist()


def test_connected_components_planted_paths(ray_session, tmp_path):
    """Per-lang paths incl. a 200-doc chain (multi-round propagation) and
    singleton langs; every doc must label with its lang's min doc_id."""
    from index_ray.pipelines.graph import connected_components

    rng = np.random.default_rng(11)
    ids = rng.permutation(10_000)[:260]
    langs = (
        ["long"] * 200    # 200-node path: needs O(log n) LS/SS rounds
        + ["mid"] * 40
        + ["pair"] * 2
        + [f"solo{i}" for i in range(18)]  # singletons
    )
    d = tmp_path / "cc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([int(x) for x in ids], pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(["x"] * len(langs), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = connected_components(str(d), num_partitions=4, distributed=True).to_pandas()
    assert len(out) == len(ids)
    want = {}
    by_lang = {}
    for i, lg in zip(ids, langs):
        by_lang.setdefault(lg, []).append(int(i))
    for lg, members in by_lang.items():
        for m in members:
            want[m] = min(members)
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == want


def test_connected_components_paths_agree(ray_session, tmp_path):
    """Driver and distributed tiers label identically."""
    from index_ray.pipelines.graph import connected_components

    langs = ["x"] * 30 + ["y"] * 5 + ["z"]
    d = tmp_path / "cc2"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(100, 100 + len(langs))), pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(["x"] * len(langs), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    a = connected_components(str(d), distributed=False).to_pandas()
    b = connected_components(str(d), distributed=True).to_pandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(key(a), key(b))


def _write_customers(tmp_path, rows):
    """rows: (custkey, nationkey, segment) triples."""
    d = tmp_path / "tri"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
                "c_mktsegment": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    return str(d)


def _brute_triangles(rows, window):
    """Per-node (deg, tri) over the band graph, by enumeration."""
    from itertools import combinations

    edges = set()
    for (a, na, sa), (b, nb, sb) in combinations(sorted(rows), 2):
        if na == nb and sa == sb and 0 < b - a <= window:
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            # each triangle is found via all 3 of its edges -> every vertex
            # is incremented 3 times per triangle; divide below
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {v: (len(adj[v]), tri[v] // 3) for v in adj}


def test_triangle_count_planted_vs_bruteforce(ray_session, tmp_path):
    """K6 clique, a K3, a bucket-boundary edge (straddles the band join's
    range-replication seam at window*8), and an isolated node."""
    from index_ray.pipelines.graph import triangle_count

    window = 10  # internal bucket width R = 80
    rows = (
        # K6: six customers within 10 of each other, same (nation, seg)
        [(k, 0, "AUTO") for k in (1, 2, 3, 5, 8, 9)]
        # K3 in another group
        + [(11, 1, "AUTO"), (12, 1, "AUTO"), (13, 1, "AUTO")]
        # same nation, different segment: no cross edges
        + [(4, 0, "BLDG"), (6, 0, "BLDG")]
        # straddles the R=80 bucket boundary: 75 | 82 (diff 7 <= 10)
        + [(75, 2, "MACH"), (82, 2, "MACH"), (85, 2, "MACH")]
        # isolated (no neighbor within the window)
        + [(500, 0, "AUTO")]
    )
    sf_dir = _write_customers(tmp_path, rows)
    got = triangle_count(sf_dir, window=window).to_pandas()
    want = _brute_triangles(rows, window)
    assert set(got["c_custkey"]) == set(want)  # isolated 500 excluded
    for _, r in got.iterrows():
        deg, tri = want[r["c_custkey"]]
        assert (r["deg"], r["tri"]) == (deg, tri), r["c_custkey"]
    # spot-pin the cliques: K6 nodes have deg 5 / tri C(5,2)=10
    k6 = got[got["c_custkey"].isin([1, 2, 3, 5, 8, 9])]
    assert (k6["deg"] == 5).all() and (k6["tri"] == 10).all()
    k3 = got[got["c_custkey"].isin([11, 12, 13])]
    assert (k3["deg"] == 2).all() and (k3["tri"] == 1).all()
    seam = got[got["c_custkey"].isin([75, 82])]
    assert (seam["deg"] == 2).all() and (seam["tri"] == 1).all()


def test_bfs_hops_planted_path(ray_session, tmp_path):
    """Path graph c1-s1-c2-s2-...: distances grow 1 per hop; nodes past
    max_hops are absent; an isolated seed still appears at dist 0."""
    from index_ray.pipelines.graph import bfs_hops

    # chain: cust k - supp k - cust k+1 (k = 1..6) => path of 13 nodes
    pairs = []
    for k in range(1, 7):
        pairs.append((k, k))
        pairs.append((k + 1, k))
    d = _write_graph(tmp_path, pairs)
    # seed at cust 1 (node 2) plus isolated node 9999*2
    out = (
        bfs_hops(d, seeds=[2, 19998], max_hops=4, num_buckets=4)
        .to_pandas()
        .sort_values("node")
    )
    got = dict(zip(out["node"], out["dist"]))
    want = {2: 0, 19998: 0}  # cust1 seed + isolated seed
    # walk the chain: supp k at 2k-1 hops... path order: c1(2) s1(3) c2(4) s2(5)...
    # dist(s_k) = 2k-1, dist(c_{k+1}) = 2k
    for k in range(1, 7):
        dk = 2 * k - 1
        if dk <= 4:
            want[k * 2 + 1] = dk
        if 2 * k <= 4:
            want[(k + 1) * 2] = 2 * k
    assert got == want
    kinds = dict(zip(out["node"], out["kind"]))
    assert all(kinds[n] == ("customer" if n % 2 == 0 else "supplier") for n in got)


def test_bfs_hops_bucket_invariance(ray_session, tmp_path):
    from index_ray.pipelines.graph import bfs_hops

    rng = np.random.default_rng(11)
    pairs = [
        (int(c), int(s))
        for c, s in zip(rng.integers(1, 40, 200), rng.integers(1, 12, 200))
    ]
    d = _write_graph(tmp_path, pairs)
    a = bfs_hops(d, max_hops=3, num_buckets=1).to_pandas().sort_values("node")
    b = bfs_hops(d, max_hops=3, num_buckets=16).to_pandas().sort_values("node")
    assert a["node"].tolist() == b["node"].tolist()
    assert a["dist"].tolist() == b["dist"].tolist()


def test_label_propagation_planted(ray_session, tmp_path):
    """Two seed labels race down a path: the closer seed wins each node;
    the tie node (equidistant, equal votes) takes the SMALLER label;
    seeds stay clamped; bucket counts don't change anything."""
    from index_ray.pipelines.graph import label_propagation

    # path: c1 - s1 - c2 - s2 - c3 - s3 - c4, seeds c1(label 5), c4(label 4)
    pairs = []
    for k in range(1, 4):
        pairs.append((k, k))
        pairs.append((k + 1, k))
    d = _write_graph(tmp_path, pairs)
    seeds = {1 * 2: 5, 4 * 2: 4}
    out = (
        label_propagation(d, seeds=seeds, rounds=3, num_buckets=4)
        .to_pandas()
        .sort_values("node")
    )
    got = dict(zip(out["node"], out["label"]))
    # s1 from c1; s3 from c4; c2 from s1; c3 from s3;
    # s2 equidistant (c2 label 5 vs c3 label 4 arrive same round) -> min 4
    want = {2: 5, 8: 4, 3: 5, 7: 4, 4: 5, 6: 4, 5: 4}
    assert got == want
    a = label_propagation(d, seeds=seeds, rounds=3, num_buckets=1).to_pandas()
    b = label_propagation(d, seeds=seeds, rounds=3, num_buckets=16).to_pandas()
    assert (
        a.sort_values("node")["label"].tolist()
        == b.sort_values("node")["label"].tolist()
    )


# ------------------------------------------------- Adamic-Adar ----


def _write_customers(tmp_path, rows, name="aa"):
    """rows: (custkey, nationkey, segment)."""
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_nationkey": pa.array([r[1] for r in rows], pa.int64()),
                "c_mktsegment": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    return str(d)


def test_band_edges_no_duplicates_across_buckets(ray_session, tmp_path):
    """Regression: with window=20 (R=160) and >1 band bucket hashed into
    the same partition, cross-bucket pairs used to be emitted twice (the
    finalize windowed across bkt values)."""
    from index_ray.pipelines.graph import _band_edges

    keys = list(range(1, 1201))
    sf = _write_customers(tmp_path, [(key, 0, "A") for key in keys])
    e = _band_edges(sf, 20, 3).to_pandas()  # 3 partitions << 8 buckets
    assert len(e) == len(e.drop_duplicates())
    expect = {
        (a, b) for a in keys for b in range(a + 1, min(a + 21, 1201))
    }
    assert set(zip(e["a"], e["b"])) == expect


def _brute_aa(keys, window, k):
    import math

    nbr = {a: set() for a in keys}
    for a in keys:
        for b in keys:
            if a < b <= a + window:
                nbr[a].add(b)
                nbr[b].add(a)
    scores = {}
    for z in keys:
        if len(nbr[z]) < 2:
            continue
        w = int(math.floor(1e9 / math.log(len(nbr[z])) + 0.5))
        ns = sorted(nbr[z])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                scores[(ns[i], ns[j])] = scores.get((ns[i], ns[j]), 0) + w
    out = [(a, b, s) for (a, b), s in scores.items() if b not in nbr[a]]
    out.sort(key=lambda r: (-r[2], r[0], r[1]))
    return out[:k]


def test_adamic_adar_planted(ray_session, tmp_path):
    from index_ray.pipelines.graph import adamic_adar

    # two (nation, segment) groups; window 2 => non-adjacent pairs at
    # distance 3..4 share 1-2 common neighbors of varying degree
    rows = [(key, key % 2, "A") for key in range(1, 41)]
    sf = _write_customers(tmp_path, rows)
    got = adamic_adar(sf, window=2, k=15).to_pandas()
    # per-group adjacency: same parity, |b-a| <= 2*2 is NOT right — edges
    # are key-distance <= 2 within the same group, so same-parity keys at
    # distance 2; brute-force each group then merge
    import math

    nbr = {a: set() for a, _, _ in rows}
    for a, na, _ in rows:
        for b, nb, _ in rows:
            if na == nb and a < b <= a + 2:
                nbr[a].add(b)
                nbr[b].add(a)
    scores = {}
    for z in nbr:
        if len(nbr[z]) < 2:
            continue
        w = int(math.floor(1e9 / math.log(len(nbr[z])) + 0.5))
        ns = sorted(nbr[z])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                scores[(ns[i], ns[j])] = scores.get((ns[i], ns[j]), 0) + w
    want = [(a, b, s) for (a, b), s in scores.items() if b not in nbr[a]]
    want.sort(key=lambda r: (-r[2], r[0], r[1]))
    want = want[:15]
    got_rows = list(zip(got["a"], got["b"], got["aa_e9"]))
    assert [tuple(map(int, r)) for r in got_rows] == want


def _reference_ppr(pairs, seeds, iters=3):
    from index_ray.pipelines.graph import SCALE

    uniq = sorted({(c * 2, s * 2 + 1) for c, s in pairs})
    edges = [(a, b) for a, b in uniq] + [(b, a) for a, b in uniq]
    nodes = sorted({u for u, _ in edges})
    deg = {u: 0 for u in nodes}
    for u, _ in edges:
        deg[u] += 1
    per_seed = SCALE // len(seeds)
    base = (15 * SCALE // 100) // len(seeds)
    r = {u: (per_seed if u in seeds else 0) for u in nodes}
    for _ in range(iters):
        nxt = {u: (base if u in seeds else 0) for u in nodes}
        for u, v in edges:
            nxt[v] += (r[u] * 85 // 100) // deg[u]
        r = nxt
    return r


def test_personalized_pagerank_planted(ray_session, tmp_path):
    from index_ray.pipelines.graph import personalized_pagerank

    pairs = [(1, 1), (1, 2), (2, 2), (3, 3), (4, 3), (4, 4), (5, 5)]
    sf = _write_graph(tmp_path, pairs)
    seeds = [2, 4]  # customers 1 and 2
    got = (
        personalized_pagerank(sf, iters=3, num_buckets=4, seeds=seeds)
        .to_pandas()
        .set_index("node")["rank_fp"]
        .to_dict()
    )
    want = _reference_ppr(pairs, set(seeds))
    assert got == want
    # teleport localization: the disconnected (5,5) component gets zero
    assert got[10] == 0 and got[11] == 0


def _reference_kcore(nbr, k):
    alive = {v for v, ns in nbr.items() if ns}
    changed = True
    while changed:
        changed = False
        for v in sorted(alive):
            deg = sum(1 for u in nbr[v] if u in alive)
            if deg < k:
                alive.discard(v)
                changed = True
    return {
        v: sum(1 for u in nbr[v] if u in alive) for v in sorted(alive)
    }


def test_k_core_planted(ray_session, tmp_path):
    """Planted graph: a clique-ish dense cluster survives k=3, pendant
    chains peel away (including cascades)."""
    from index_ray.pipelines.graph import k_core

    # group A: keys 1..6 within window 5 (dense); group B: a chain
    # 100,105,110,... (each sees only 1 neighbor at window 5)
    rows = [(key, 0, "A") for key in range(1, 7)]
    rows += [(100 + 5 * i, 0, "B") for i in range(6)]
    sf = _write_customers(tmp_path, rows, name="kc")
    got = k_core(sf, k=3, window=5, num_buckets=4).to_pandas()
    import collections

    nbr = collections.defaultdict(set)
    for key, nk, seg in rows:
        for key2, nk2, seg2 in rows:
            if nk == nk2 and seg == seg2 and key < key2 <= key + 5:
                nbr[key].add(key2)
                nbr[key2].add(key)
    want = _reference_kcore(nbr, 3)
    assert dict(zip(got["node"], got["deg_in_core"])) == want
    assert len(want) > 0  # the dense cluster really survives
    assert all(n < 100 for n in want)  # the chain really peeled
