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
