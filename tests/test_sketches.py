"""HLL distinct sketch + IVF ANN: determinism, error bound, recall."""

import numpy as np

import index_ray.pipelines.similarity as sim
from index_ray.pipelines.sketches import _estimate, _registers, distinct_users_hll

SF = "/root/testdata/sf0.001"


def test_hll_estimate_error_bound():
    # pure-kernel check across cardinalities: 2-split merge == single pass,
    # estimate within 5% (p=12 -> sigma ~1.6%)
    for n in (50, 1000, 20000, 200000):
        ids = np.arange(n, dtype=np.int64) * 7919 + 13
        regs = _registers(ids, 12)
        a, b = _registers(ids[: n // 2], 12), _registers(ids[n // 2 :], 12)
        assert np.array_equal(np.maximum(a, b), regs)  # mergeability
        est = _estimate(regs, 12)
        assert abs(est - n) <= 0.05 * n, (n, est)


def test_hll_pipeline_matches_exact(ray_session):
    t = distinct_users_hll(SF).to_pydict()
    assert t["n_distinct"] == [15] * 5  # sf0.001: 15 users, all 5 types
    assert t["hll_within_5pct"] == [1] * 5


def test_ivf_consistency_and_recall(ray_session):
    cons = sim.ivf_knn_consistency(SF).to_pydict()
    assert cons["n_rank_inversions"] == [0, 0, 0]
    assert cons["top1_is_self"] == [1, 1, 1]
    exact = sim.knn_cosine(SF).to_pandas()
    ivf = sim.ivf_knn_cosine(SF).to_pandas()
    recalls = []
    for qid in (0, 1, 2):
        e = set(exact[exact.qid == qid]["vec_id"])
        a = set(ivf[ivf.qid == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 16 lists


def test_kmeans_deterministic(ray_session):
    a = sim.kmeans_fit(SF, n_centroids=8, iters=2)
    b = sim.kmeans_fit(SF, n_centroids=8, iters=2)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_cms_no_undercount_and_bounded_error(ray_session):
    from index_ray.pipelines.sketches import cms_term_counts

    t = cms_term_counts(SF).to_pandas()
    assert (t["cms_no_undercount"] == 1).all()


def test_bigram_counts_spot_check(ray_session):
    import duckdb

    from index_ray.pipelines.text import bigram_counts, bigram_counts_sql_oracle

    got = bigram_counts(SF).to_pandas().sort_values(["bigram"]).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(bigram_counts_sql_oracle()).df().sort_values(["bigram"]).reset_index(drop=True)
    assert got["bigram"].tolist() == want["bigram"].tolist()
    assert got["cf"].tolist() == want["cf"].tolist()


def test_approx_percentiles_within_bound(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.sketches import (
        approx_percentiles,
        approx_percentiles_sql_oracle,
    )

    got = approx_percentiles("/root/testdata/sf0.001").to_pandas()
    assert (got["sketch_within_2pct"] == 1).all()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'"
    )
    want = con.sql(approx_percentiles_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_mg_reduce_contract():
    """<= k survivors; every survivor underestimated by exactly the
    deduction; any item with weight > total/(k+1) always survives."""
    from index_ray.pipelines.sketches import _mg_reduce

    rng = np.random.default_rng(3)
    wts = rng.integers(1, 50, 2000).astype(np.int64)
    wts[7] = wts.sum()  # one true heavy hitter
    terms = np.array([f"t{i}" for i in range(len(wts))], object)
    st, sw = _mg_reduce(terms, wts, 16)
    assert len(st) <= 16
    assert "t7" in set(st)  # > total/17 by construction
    lookup = dict(zip(st, sw))
    d = wts[7] - lookup["t7"]
    assert d >= 0
    for t, w in lookup.items():  # uniform deduction, exact residuals
        assert wts[int(t[1:])] - w == d


def test_heavy_hitters_planted_eviction(ray_session):
    """Vocab >> MG_COUNTERS with a Zipf head: the pipeline must return
    EXACTLY the terms meeting the 2N/(k+1)+1 threshold with exact counts,
    despite per-batch evictions."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.sketches import MG_COUNTERS, heavy_hitter_terms

    rng = np.random.default_rng(11)
    # 4000 distinct tail terms + 5 hot terms woven through 600 docs
    docs = []
    for i in range(600):
        toks = [f"w{rng.integers(0, 4000)}" for _ in range(30)]
        if i % 2 == 0:
            toks += [f"hot{i % 5}"] * 20
        docs.append(" ".join(toks))
    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="hh_")
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))

    got = heavy_hitter_terms(d).to_pandas().sort_values("term").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    from index_ray.pipelines.sketches import heavy_hitter_terms_sql_oracle

    want = con.sql(heavy_hitter_terms_sql_oracle()).df().sort_values("term").reset_index(drop=True)
    assert len(want) >= 5  # the planted hot terms qualify
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_centroid_classify_deterministic_and_total(ray_session):
    """Integer-deterministic: two runs bit-identical; confusion counts sum
    to the corpus size; every true label appears."""
    import pyarrow.parquet as pq

    from index_ray.pipelines.similarity import centroid_classify

    a = centroid_classify("/root/testdata/sf0.001")
    b = centroid_classify("/root/testdata/sf0.001")
    assert a.equals(b)
    n = pq.read_metadata("/root/testdata/sf0.001/embeddings.parquet").num_rows
    d = a.to_pydict()
    assert sum(d["n"]) == n
    assert set(d["label"]) == set(range(10))


def test_centroid_classify_noncontiguous_labels(ray_session, tmp_path):
    """Labels {0,5,9} (not 0..L-1) and negative components: the confusion
    key must index by label POSITION and centroid division must truncate
    like DuckDB — both pinned against the SQL oracle."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.similarity import (
        centroid_classify,
        centroid_classify_sql_oracle,
    )

    rng = np.random.default_rng(5)
    labs = np.array([0, 5, 9])
    rows_lab, vecs = [], []
    for li, lab in enumerate(labs):
        c = rng.standard_normal(8) * 2.0 - 1.0  # negative-heavy centers
        for _ in range(40):
            vecs.append((c + rng.standard_normal(8) * 0.3).astype(np.float32))
            rows_lab.append(lab)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(rows_lab, pa.int32()),
        }
    )
    d = str(tmp_path / "emb")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))
    got = centroid_classify(d).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    want = con.sql(centroid_classify_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert set(got["label"]) == {0, 5, 9}


def test_hll_intersections_planted_overlap(ray_session, tmp_path):
    """Three event types with known pairwise user overlaps: the exact leg
    must be exact, and the inclusion-exclusion estimate must stay within
    the pinned 10% on every pair (tiny row groups split the input into
    multiple blocks so both partial merges actually run)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.sketches import hll_intersections

    # users: A = 0..1999, B = 1000..2999 (|A∩B| = 1000), C = 0..499 union
    # 2500..2999 (|A∩C| = 500, |B∩C| = 500)
    a = list(range(0, 2000))
    b = list(range(1000, 3000))
    c = list(range(0, 500)) + list(range(2500, 3000))
    uid = a + b + c
    et = ["A"] * len(a) + ["B"] * len(b) + ["C"] * len(c)
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(uid)), pa.int64()),
            "ts": pa.array([0] * len(uid), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array([1.0] * len(uid), pa.float64()),
        }
    )
    d = str(tmp_path / "ev")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"), row_group_size=1000)
    got = hll_intersections(d).to_pandas().set_index(["type_a", "type_b"])
    assert got.loc[("A", "B"), "n_both"] == 1000
    assert got.loc[("A", "C"), "n_both"] == 500
    assert got.loc[("B", "C"), "n_both"] == 500
    assert (got["ie_within_10pct"] == 1).all()


def test_vocab_size_hll_large_vocab(ray_session, tmp_path):
    """HLL vocabulary estimate stays within 5% on a 6k-term planted vocab
    (past the linear-counting regime's trivial range)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.sketches import vocab_size_hll

    rng = np.random.default_rng(7)
    words = [f"w{i:05d}" for i in range(6000)]
    texts = [
        " ".join(rng.choice(words, size=80))
        for _ in range(300)
    ]
    d = tmp_path / "vh"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    t = vocab_size_hll(str(d)).to_pandas()
    n = int(t["n_terms"][0])
    assert 4000 < n <= 6000  # sampled-with-replacement coverage
    assert int(t["hll_within_5pct"][0]) == 1
