"""Set-similarity join: planted prefix-filter cases + oracle equality."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from index_ray.pipelines.linkage import (
    set_similarity_join,
    set_similarity_join_sql_oracle,
)

SF = "/root/testdata/sf0.001"


def test_set_similarity_join_matches_oracle(ray_session):
    got = set_similarity_join(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'")
    want = con.sql(set_similarity_join_sql_oracle()).df()
    a = got.sort_values(["a", "b"]).reset_index(drop=True)
    b = want.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_set_similarity_join_planted(ray_session, tmp_path):
    """Planted boundary cases: 3-of-5 union (j=60) in, 2-of-6 union
    (j=33) out, identical names j=100, duplicate tokens deduped, and a
    longer record whose PREFIX must still catch its partner (recall 1)."""
    d = tmp_path / "ssj"
    d.mkdir()
    names = [
        (1, "alpha beta gamma delta"),      # pairs with 2 at j=60
        (2, "alpha beta gamma epsilon"),
        (3, "alpha beta zeta eta"),          # i=2,u=6 vs 1 -> j=33, out
        (4, "solo token"),
        (5, "solo token"),                   # identical -> j=100
        (6, "solo token token solo"),        # dup tokens dedupe -> ==4/5
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([i for i, _ in names], pa.int64()),
                "p_name": pa.array([n for _, n in names], pa.string()),
            }
        ),
        str(d / "part.parquet"),
    )
    got = set_similarity_join(str(d), threshold_pct=50).to_pandas()
    pairs = {(r.a, r.b): r.jaccard_pct for r in got.itertuples()}
    assert pairs[(1, 2)] == 60
    assert (1, 3) not in pairs and (2, 3) not in pairs
    assert pairs[(4, 5)] == 100 and pairs[(4, 6)] == 100 and pairs[(5, 6)] == 100
    assert len(pairs) == 4


def test_linkage_clusters_transitive_and_singletons(ray_session, tmp_path):
    """A-B and B-C similar but A-C not: all three must share one cluster
    (transitivity through CC); unmatched records are their own cluster."""
    d = tmp_path / "lc"
    d.mkdir()
    # token sets sized so consecutive overlap passes t=50 but A-C fails:
    # A={1..4}, B={2..5} (i=3,u=5 -> 60), C={3..6} (B-C 60; A-C i=2,u=6 -> 33)
    names = [
        (10, "t1 t2 t3 t4"),
        (11, "t2 t3 t4 t5"),
        (12, "t3 t4 t5 t6"),
        (13, "zz yy xx ww"),  # singleton
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([i for i, _ in names], pa.int64()),
                "p_name": pa.array([n for _, n in names], pa.string()),
            }
        ),
        str(d / "part.parquet"),
    )
    from index_ray.pipelines.linkage import linkage_clusters

    got = linkage_clusters(str(d), threshold_pct=50).to_pandas()
    clusters = dict(zip(got["p_partkey"], got["cluster"]))
    assert clusters[10] == clusters[11] == clusters[12] == 10  # transitive
    assert clusters[13] == 13  # singleton keeps its own id


def test_cosine_similarity_join_matches_oracle(ray_session):
    from index_ray.pipelines.linkage import (
        cosine_similarity_join,
        cosine_similarity_join_sql_oracle,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(cosine_similarity_join_sql_oracle()).df()
    got = cosine_similarity_join(sf).to_pandas()
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    import numpy as np

    np.testing.assert_allclose(got["cos_sim"], want["cos_sim"], rtol=0, atol=1e-9)


def test_cosine_similarity_join_planted(ray_session, tmp_path):
    """Planted geometry: a near-identical doc pair must survive, an
    orthogonal doc must not pair with anything, and a pair sharing only a
    stop-like hot term must land below the threshold — recall of the
    prefix filter and precision of the verify in one corpus."""
    import numpy as np
    import pyarrow.parquet as _pq

    d = tmp_path / "sf"
    d.mkdir()
    docs = [
        (0, "alpha beta gamma delta alpha beta"),
        (1, "alpha beta gamma delta alpha epsilon"),  # near-dup of 0
        (2, "zeta zeta zeta zeta common"),            # mostly orthogonal
        (3, "omega omega omega common"),              # shares only 'common' w/ 2
    ]
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    from index_ray.pipelines.linkage import cosine_similarity_join

    got = cosine_similarity_join(str(d), threshold_pct=80).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs), pairs
    # exact value check against a scalar recompute
    tf = {i: {} for i, _ in docs}
    for i, t in docs:
        for w in t.split():
            tf[i][w] = tf[i].get(w, 0) + 1
    df = {}
    for i in tf:
        for w in tf[i]:
            df[w] = df.get(w, 0) + 1
    N = len(docs)
    wv = {
        i: {w: c * np.log(1 + N / df[w]) for w, c in tf[i].items()} for i in tf
    }
    dot = sum(wv[0][w] * wv[1].get(w, 0.0) for w in wv[0])
    na = np.sqrt(sum(v * v for v in wv[0].values()))
    nb = np.sqrt(sum(v * v for v in wv[1].values()))
    want = dot / (na * nb)
    got01 = float(got[(got["a"] == 0) & (got["b"] == 1)]["cos_sim"].iloc[0])
    assert abs(got01 - want) < 1e-12


def test_tile_kernels_bound_bucket_emit():
    """_tiles_by_tok never materializes O(g^2) pairs in one table: a
    bucket of g members yields ceil(g/T)*(ceil(g/T)+1)/2 descriptor rows
    whose blobs each hold <= T ids, and _expand_tiles recovers exactly
    the triu pair set."""
    import numpy as np

    from index_ray.pipelines.linkage import MAX_TILE, _expand_tiles, _tiles_by_tok

    g = 2 * MAX_TILE + 100  # 3 chunks -> 6 tiles
    ids = np.arange(g, dtype=np.int64) * 7  # arbitrary sorted ids
    t = pa.table(
        {
            "tok": pa.array(np.zeros(g, np.int64)),
            "doc_id": pa.array(ids),
        }
    )
    tiles = _tiles_by_tok(t)
    n_chunks = -(-g // MAX_TILE)
    assert tiles.num_rows == n_chunks * (n_chunks + 1) // 2
    assert max(len(x) for x in tiles["a_ids"].to_pylist()) <= 8 * MAX_TILE
    assert max(len(x) for x in tiles["b_ids"].to_pylist()) <= 8 * MAX_TILE
    got = _expand_tiles(tiles)
    a, b = got["a"].to_numpy(), got["b"].to_numpy()
    assert (a < b).all()
    ii, jj = np.triu_indices(g, k=1)
    want = set(zip(ids[ii].tolist(), ids[jj].tolist()))
    assert set(zip(a.tolist(), b.tolist())) == want


def test_set_similarity_join_hot_token_tiled(ray_session, tmp_path):
    """Planted hot token PAST the real MAX_TILE edge: every record is
    'hot u<i//2>' — both tokens are prefix tokens (p = 2 for n = 2 at
    t = 50), so the 'hot' bucket holds ALL g = 600 > 512 records and the
    worker-side emit must go through multiple tiles.  The join must
    still return exactly the brute-force pair set (the 300 identical
    name pairs at j = 100), with every candidate group output bounded."""
    import numpy as np

    from index_ray.pipelines.linkage import MAX_TILE

    g = 600
    assert g > MAX_TILE  # the point of the test
    names = [f"hot u{i // 2}" for i in range(g)]
    d = tmp_path / "hot"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(g, dtype=np.int64)),
                "p_name": pa.array(names, pa.string()),
            }
        ),
        str(d / "part.parquet"),
    )
    got = set_similarity_join(str(d), threshold_pct=50).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{d / 'part.parquet'}'")
    want = con.sql(set_similarity_join_sql_oracle(50)).df()
    a = got.sort_values(["a", "b"]).reset_index(drop=True)
    b = want.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(a) == len(b) == g // 2  # exactly the planted identical pairs
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_tiles_in_bucket_generic_cross_and_multiplicity():
    """util._tiles_in_bucket is the repo-wide bounded emitter: (a) a
    two-sided ``side_fn`` yields exactly the cross product L x R in
    bounded tiles; (b) a bucket holding several key groups emits each
    group's pairs exactly once — the multiplicity-across-groups contract
    the gram-Jaccard pair-count shuffle depends on."""
    import numpy as np

    from index_ray.util import MAX_TILE, _expand_tiles, _tiles_in_bucket

    # (a) cross-sided: ids 0..(2*MAX_TILE+9), evens are the right side
    n = 2 * MAX_TILE + 10
    ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {"gram": pa.array(np.zeros(n, np.int64)), "doc_id": pa.array(ids)}
    )

    def sides(v):
        ev = v % 2 == 0
        return v[~ev], v[ev]

    tiles = _tiles_in_bucket(t, ["gram"], side_fn=sides)
    got = _expand_tiles(tiles)
    L, R = sides(ids)
    want = set(zip(np.repeat(L, len(R)).tolist(), np.tile(R, len(L)).tolist()))
    assert set(zip(got["a"].to_pylist(), got["b"].to_pylist())) == want
    assert max(len(x) for x in tiles["a_ids"].to_pylist()) <= 8 * MAX_TILE

    # (b) multiplicity: two key groups sharing a pair -> the pair appears
    # exactly twice after expansion (once per group), duplicates within a
    # group's rows collapse first
    t2 = pa.table(
        {
            "gram": pa.array([7, 7, 7, 9, 9], pa.int64()),
            "doc_id": pa.array([1, 2, 2, 1, 2], pa.int64()),
        }
    )
    got2 = _expand_tiles(_tiles_in_bucket(t2, ["gram"]))
    pairs = list(zip(got2["a"].to_pylist(), got2["b"].to_pylist()))
    assert sorted(pairs) == [(1, 2), (1, 2)]


def test_tile_pipelines_empty_corpus(ray_session, tmp_path):
    """Every tile-verify pipeline returns its empty schema (never crashes)
    on zero-row inputs — pins the zero-block hash_partition_refs guard
    and the column-less-projection guard in term_stats' finalize."""
    import os

    d = str(tmp_path / "e")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "p_name": pa.array([], pa.string()),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    from index_ray.pipelines.dedup import ngram_jaccard_dedup, ngram_jaccard_lsh
    from index_ray.pipelines.linkage import cosine_similarity_join
    from index_ray.pipelines.similarity import embedding_neardup_lsh

    assert cosine_similarity_join(d).num_rows == 0
    assert set_similarity_join(d).num_rows == 0
    assert ngram_jaccard_dedup(d).num_rows == 0
    assert ngram_jaccard_lsh(d).num_rows == 0
    assert embedding_neardup_lsh(d).num_rows == 0
