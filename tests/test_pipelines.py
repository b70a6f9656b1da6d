"""Tests for the dedup / similarity / textstats / multimodal pipelines over
the driver testdata (sf0.001) and synthetic media."""

import numpy as np
import pytest

import index_ray.pipelines.dedup as dedup
import index_ray.pipelines.multimodal as mm
import index_ray.pipelines.similarity as sim
import index_ray.pipelines.textstats as ts

SF = "/root/testdata/sf0.001"


def test_exact_dedup_keeper_is_min(ray_session):
    t = dedup.exact_dedup(SF).to_pandas()
    assert len(t) == 500  # sf0.001 documents are all distinct
    assert (t["n_docs"] == 1).all()


def test_minhash_identical_docs_flagged(ray_session, tmp_path):
    # corpus with planted exact + near duplicates must produce pairs
    import pyarrow.parquet as pq

    from index_ray.sources.corpus import generate_corpus

    tbl = generate_corpus(120, 42)
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        tbl.rename_columns(["repo", "path", "commit", "lang", "text"]).append_column(
            "doc_id", __import__("pyarrow").array(np.arange(120), type=__import__("pyarrow").int64())
        ),
        str(d / "documents.parquet"),
    )
    pairs = dedup.minhash_dedup(str(d), mode="code").to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    # planted exact duplicates: doc i%50==1 copies i-1
    assert (0, 1) in got and (50, 51) in got and (100, 101) in got
    # planted near duplicates (one ~1% contiguous edit of i-1 at i%20==3):
    # most must be flagged (short docs can legitimately fall below the
    # 0.90 shingle-similarity threshold — an 8-token edit window is a
    # larger Jaccard dent on a 50-token doc)
    planted = [(i - 1, i) for i in range(3, 120, 20)]
    found = sum(p in got for p in planted)
    assert found >= len(planted) - 2, (found, planted, sorted(got)[:20])


def test_simhash_flags_exact_dups(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.sources.corpus import generate_corpus

    tbl = generate_corpus(120, 42)
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        tbl.rename_columns(["repo", "path", "commit", "lang", "text"]).append_column(
            "doc_id", pa.array(np.arange(120), type=pa.int64())
        ),
        str(d / "documents.parquet"),
    )
    pairs = dedup.simhash_dedup(str(d), mode="code").to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got and (50, 51) in got


def test_ngram_lsh_subset_and_planted_recall(ray_session, tmp_path):
    """LSH pairs must be a subset of exact pairs (same integer jaccard),
    and a planted identical pair must survive the banded candidate path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(80)]
    base = " ".join(rng.choice(words, size=200).tolist())
    near = base.rsplit(" ", 4)[0] + " zz yy xx qq"  # ~98% of grams shared
    other = [" ".join(rng.choice(words, size=200).tolist()) for _ in range(6)]
    texts = [base, base, near] + other
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "documents.parquet"),
    )
    exact = dedup.ngram_jaccard_dedup(str(d)).to_pandas()
    lsh = dedup.ngram_jaccard_lsh(str(d)).to_pandas()
    ex = set(zip(exact["a"], exact["b"], exact["jaccard_pct"]))
    got = set(zip(lsh["a"], lsh["b"], lsh["jaccard_pct"]))
    assert got <= ex
    assert (0, 1, 100) in got  # identical docs share every band
    assert (0, 2) in {(a, b) for a, b, _ in ex}  # near pair is a real exact pair


def test_pair_jaccard_verify_matches_bruteforce(ray_session):
    """The vectorized pair-partitioned verify must agree with per-pair
    np.intersect1d on random gram sets — including empty sets (short docs)
    and the 0-union guard."""
    import pyarrow as pa
    import ray

    rng = np.random.default_rng(17)
    n_docs = 300
    ids = np.arange(100, 100 + n_docs, dtype=np.int64)
    sets = [
        np.unique(rng.integers(0, 120, size=rng.integers(0, 60)).astype(np.uint64))
        for _ in range(n_docs)
    ]
    sets[7] = sets[7][:0]  # planted empty set
    sets[8] = sets[8][:0]  # pair (107,108) has union 0 -> must be dropped
    gt = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "grams": pa.array([s.tobytes() for s in sets], pa.binary()),
        }
    )
    npairs = 5000
    pi = rng.integers(0, n_docs, size=npairs)
    pj = rng.integers(0, n_docs, size=npairs)
    keep = pi != pj
    pa_ids = ids[np.minimum(pi, pj)[keep]]
    pb_ids = ids[np.maximum(pi, pj)[keep]]
    pa_ids = np.append(pa_ids, 107)
    pb_ids = np.append(pb_ids, 108)
    batch = pa.table(
        {"a": pa.array(pa_ids, pa.int64()), "b": pa.array(pb_ids, pa.int64())}
    )
    pct = 30
    stage = dedup._PairJaccardVerify((ray.put(gt),), pct)
    got = stage(batch).to_pandas()
    got_set = set(zip(got["a"], got["b"], got["jaccard_pct"]))
    want = set()
    for x, y in zip(pa_ids, pb_ids):
        gx, gy = sets[int(x) - 100], sets[int(y) - 100]
        inter = len(np.intersect1d(gx, gy, assume_unique=True))
        union = len(gx) + len(gy) - inter
        if union and 100 * inter >= pct * union:
            want.add((int(x), int(y), 100 * inter // union))
    assert got_set == want and len(want) > 10


def test_lsh_knn_recall(ray_session):
    exact = sim.knn_cosine(SF).to_pandas()
    approx = sim.lsh_knn_cosine(SF).to_pandas()
    # per query, LSH top-k should recover a decent fraction of exact top-k
    recalls = []
    for qid in exact["qid"].unique():
        e = set(exact[exact["qid"] == qid]["vec_id"])
        a = set(approx[approx["qid"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.2  # 8-bit keys on random vectors: weak but nonzero
    # the query vector itself must always be rank 1 (sim == 1)
    for qid in approx["qid"].unique():
        top = approx[(approx["qid"] == qid) & (approx["rank"] == 1)]["vec_id"].iloc[0]
        assert top == qid


def test_embedding_neardup_lsh_subset_of_exact(ray_session):
    exact = set(map(tuple, sim.embedding_neardup(SF).to_pandas().values))
    lsh = set(map(tuple, sim.embedding_neardup_lsh(SF).to_pandas().values))
    assert lsh <= exact


def test_hyperplane_sign_payload_is_fixed_width(ray_session):
    """The LSH shuffle payload must be (key, vec_id) only — no vector column
    crosses the groupby (round-2 regression guard: vectors were shipped
    x(nbits+1) through the shuffle)."""
    import pyarrow as pa

    rng = np.random.default_rng(11)
    batch = pa.table(
        {
            "vec_id": pa.array(np.arange(8), pa.int64()),
            "embedding": pa.array(list(rng.standard_normal((8, 16)))),
        }
    )
    out = sim._HyperplaneSign(6)(batch)
    assert out.column_names == ["key", "vec_id"]
    assert len(out) == 8 * 7  # base + 6 Hamming-1 probes per vector


def test_embedding_neardup_lsh_planted_equality(ray_session, tmp_path):
    """On a corpus whose only >=0.9-cosine pairs are exact duplicates,
    the LSH path must return EXACTLY the exact-path pair set (identical
    vectors share every bucket, so recall is 1 by construction)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, 32))
    vecs = np.concatenate([base, base[:6]])  # ids 30..35 duplicate 0..5
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
                "embedding": pa.array(list(vecs)),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    exact = set(map(tuple, sim.embedding_neardup(str(d), 0.9).to_pandas().values))
    lsh = set(map(tuple, sim.embedding_neardup_lsh(str(d), 0.9).to_pandas().values))
    assert {(i, 30 + i) for i in range(6)} <= exact
    assert lsh == exact


def test_hash_join_matches_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from index_ray.pipelines.join import hash_join

    rng = np.random.default_rng(3)
    lk = rng.integers(0, 50, size=400)  # skewed, repeated keys
    rk = np.arange(0, 60, dtype=np.int64)
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(lk, pa.int64()), "lv": pa.array(np.arange(400))})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(rk), "rv": pa.array(rk * 10)})
    )
    got = (
        hash_join(left, right, on="k", num_buckets=8)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": lk, "lv": np.arange(400)})
        .merge(pd.DataFrame({"k": rk, "rv": rk * 10}), on="k")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert got[["k", "lv", "rv"]].equals(want[["k", "lv", "rv"]])
    with pytest.raises(ValueError, match="collision"):
        hash_join(left, left, on="k")


def test_language_id_deterministic(ray_session):
    a = ts.language_id(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = ts.language_id(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["pred_lang"]) <= {"en", "fr", "es", "de", "zh", "unknown"}


def test_fingerprints_detect_shared_content(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["alpha beta gamma delta epsilon zeta eta theta " * 10,
             "alpha beta gamma delta epsilon zeta eta theta " * 10,  # identical
             "completely different words here now okay then yes no " * 10]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts)}),
        str(d / "documents.parquet"),
    )
    fp = ts.fingerprints(str(d)).to_pandas().sort_values("doc_id")
    assert fp["fingerprint"].iloc[0] == fp["fingerprint"].iloc[1]
    assert fp["fingerprint"].iloc[0] != fp["fingerprint"].iloc[2]


def test_media_decode_roundtrip():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    assert (mm.decode_payload(mm.encode_raw1(arr)) == arr).all()


def test_media_unknown_codec_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"\xff\xd8\xff\xe0 fake jpeg bytes")


def test_media_features_pipeline(ray_session):
    out = mm.media_features("ignored", n=50).to_pandas()
    assert len(out) == 50
    assert {"media_id", "mean_px", "std_px", "hist_hash"} <= set(out.columns)
    out2 = mm.media_features("ignored", n=50).to_pandas()
    assert out.sort_values("media_id").reset_index(drop=True).equals(
        out2.sort_values("media_id").reset_index(drop=True)
    )


def test_video_frame_sample(ray_session):
    out = mm.video_frame_sample("ignored", n=16).to_pandas()
    assert (out["frame_idx"] % 4 == 0).all()
    assert out.groupby("media_id").size().min() >= 1
    assert (out["frame_bytes"] > 9).all()


def test_keywords_tfidf_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.text import keywords_tfidf, keywords_tfidf_sql_oracle

    got = keywords_tfidf(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(keywords_tfidf_sql_oracle()).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # every doc with tokens contributes ranks 1..min(k, n_unique)
    assert (got.groupby("doc_id")["rank"].min() == 1).all()


def test_regex_search_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.text import regex_search, regex_search_sql_oracle

    got = regex_search(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(regex_search_sql_oracle()).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (got["n_matches"] > 0).all()


def test_bm25_not_matches_duckdb_and_prune_invariant(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.flagship import (
        NOT_QUERIES,
        bm25_not_sql_oracle,
        bm25_not_topk,
        documents_index,
    )
    from index_ray.pipelines.query import BM25Searcher

    got = bm25_not_topk(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(bm25_not_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # prune must be lossless over the allowed set
    searcher = BM25Searcher(documents_index(SF))
    qs = [(" ".join(t), k) for _, t, _, k in NOT_QUERIES]
    exc = [" ".join(e) for _, _, e, _ in NOT_QUERIES]
    pruned = searcher.search_many(qs, prune=True, exclude=exc)
    full = searcher.search_many(qs, prune=False, exclude=exc)
    for p, f in zip(pruned, full):
        assert p["docID"].to_pylist() == f["docID"].to_pylist()
        assert p["score"].to_pylist() == f["score"].to_pylist()


def test_collocations_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.text import collocations, collocations_sql_oracle

    got = collocations(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(collocations_sql_oracle()).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(got) > 0  # threshold is calibrated to produce matches


def test_bm25_prefix_matches_duckdb_and_prune_invariant(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.flagship import (
        PREFIX_QUERIES,
        bm25_prefix_sql_oracle,
        bm25_prefix_topk,
        documents_index,
    )
    from index_ray.pipelines.query import BM25Searcher

    got = bm25_prefix_topk(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(bm25_prefix_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    searcher = BM25Searcher(documents_index(SF))
    qs = [(q, k) for _, q, k in PREFIX_QUERIES]
    pruned = searcher.search_prefix_many(qs, prune=True)
    full = searcher.search_prefix_many(qs, prune=False)
    for p, f in zip(pruned, full):
        assert p["docID"].to_pylist() == f["docID"].to_pylist()
        assert p["score"].to_pylist() == f["score"].to_pylist()
    assert len(pruned[3]) == 0  # zzz* matches nothing


def test_pq_knn_recall_and_consistency(ray_session):
    exact = sim.knn_cosine(SF).to_pandas()
    approx = sim.pq_knn_cosine(SF).to_pandas()
    recalls = []
    for qid in exact["qid"].unique():
        e = set(exact[exact["qid"] == qid]["vec_id"])
        a = set(approx[approx["qid"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # 4k-candidate PQ scan + exact refine: much stronger than raw LSH
    assert np.mean(recalls) >= 0.6
    cons = sim.pq_knn_consistency(SF).to_pandas()
    assert (cons["n_rank_inversions"] == 0).all()
    assert (cons["top1_is_self"] == 1).all()


def test_cc_clusters_matches_driver_path(ray_session):
    # planted graph: one 10^4-edge path component (worst-case diameter for
    # label propagation), a star, a triangle, and isolated pairs — the
    # distributed hash-to-min rounds must produce the identical label map
    # to the in-memory min_label_propagation
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(7)
    chain = np.arange(10_000, dtype=np.int64) + 100
    a_parts = [chain[:-1], np.full(50, 50_000, np.int64), np.array([1, 2, 1], np.int64)]
    b_parts = [chain[1:], 50_001 + np.arange(50), np.array([2, 3, 3], np.int64)]
    iso = 60_000 + rng.permutation(200).astype(np.int64)
    a_parts.append(iso[:100])
    b_parts.append(iso[100:])
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    # shuffle edge order and orientation so nothing depends on input layout
    flip = rng.random(len(a)) < 0.5
    a2 = np.where(flip, b, a)
    b2 = np.where(flip, a, b)
    perm = rng.permutation(len(a2))
    edges = pa.table({"a": pa.array(a2[perm]), "b": pa.array(b2[perm])})
    ds = ray.data.from_arrow(edges).repartition(8)

    got = (
        dedup.cc_clusters(ds, num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    members, rep = dedup.min_label_propagation(a, b)
    assert got["doc_id"].to_numpy().tolist() == members.tolist()
    assert got["cluster_rep"].to_numpy().tolist() == rep.tolist()
    # structural spot checks
    lab = dict(zip(got["doc_id"], got["cluster_rep"]))
    assert lab[chain[-1]] == 100 and lab[50_030] == 50_000 and lab[3] == 1


def test_minhash_clusters_distributed_flag_equivalence(ray_session):
    t_driver = dedup.minhash_clusters(SF, distributed=False)
    t_dist = dedup.minhash_clusters(SF, distributed=True)
    assert t_driver.to_pydict() == t_dist.to_pydict()


def test_repeated_ngrams_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    got = dedup.repeated_ngrams(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(dedup.repeated_ngrams_sql_oracle()).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # structural invariants: repeated occurrences never exceed totals
    assert (got["n_rep_occ"] <= got["n_grams"]).all()
    assert (got["n_rep_grams"] <= got["n_grams"]).all()


def test_hot_ngrams_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    got = dedup.hot_ngrams(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(dedup.hot_ngrams_sql_oracle()).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (got["df"] >= 2).all()


def test_repeated_ngrams_planted_boilerplate(ray_session, tmp_path):
    """Documents sharing a verbatim license header are flagged span-level
    even though every document is globally unique (doc-level dedup keeps
    them all)."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    header = "permission is hereby granted free of charge to any person"
    texts = [f"{header} body variant {i} with unique tail tokens t{i}" for i in range(6)]
    texts.append("a completely different document about walruses and pack ice")
    t = pa.table({"doc_id": pa.array(range(7), pa.int64()), "text": texts})
    pq.write_table(t, tmp_path / "documents.parquet")

    out = dedup.repeated_ngrams(str(tmp_path), k=4, min_df=2).to_pandas()
    rep = out.set_index("doc_id")
    # every header-carrying doc shows the 7 repeated header 4-grams
    assert (rep.loc[0:5, "n_rep_grams"] >= 7).all()
    assert rep.loc[6, "n_rep_occ"] == 0
    # doc-level exact dedup would NOT collapse these (all texts distinct)
    ex = dedup.exact_dedup(str(tmp_path)).to_pandas()
    assert (ex["n_docs"] == 1).all()

    hot = dedup.hot_ngrams(str(tmp_path), k=4, min_df=2).to_pandas()
    assert hot.iloc[0]["df"] == 6
    assert hot.iloc[0]["gram"].split()[0] in header


def test_dedup_canonical_planted(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.dedup import dedup_canonical

    d = tmp_path / "docs"
    d.mkdir()
    # docs 1-3 identical (simhash-equal, token tie -> smallest id dominates);
    # doc 4 is the text doubled: same tf sign pattern -> same simhash, but
    # twice the tokens -> dominates everything.  doc 9 is unrelated.
    base = "alpha beta gamma delta epsilon zeta"
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 9],
            "text": [base, base, base, base + " " + base,
                     "totally different words here entirely unrelated"],
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    got = dedup_canonical(str(d)).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got["kept_by"].tolist() == [4, 4, 4]
    assert got["n_tokens"].tolist() == [6, 6, 6]


def test_media_phash_dedup_planted_and_bruteforce(ray_session):
    t = mm.media_phash_dedup("ignored", n=60, n_dups=5)
    got = set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    # every planted variant links back to its source
    for i in range(5):
        assert ((i * 7) % 60, 60 + i) in got
    # brute force: all-pairs Hamming over locally computed hashes
    tbl = mm.synth_media_with_dups(60, 5)
    hv = {
        mid: mm.ahash64(mm.decode_payload(p))
        for mid, p in zip(tbl["media_id"].to_pylist(), tbl["payload"].to_pylist())
    }
    want = set()
    ids = sorted(hv)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if bin(hv[ids[x]] ^ hv[ids[y]]).count("1") <= mm.PHASH_MAX_HAMMING:
                want.add((ids[x], ids[y]))
    assert got == want
    # hamming column is the true distance
    for a, b, h in zip(t["a"].to_pylist(), t["b"].to_pylist(), t["hamming"].to_pylist()):
        assert bin(hv[a] ^ hv[b]).count("1") == h


def test_more_like_this_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.flagship import (
        MLT_K,
        MLT_SOURCES,
        more_like_this,
        more_like_this_sql_oracle,
    )

    got = more_like_this(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(more_like_this_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the source document itself must never appear in its own result
    for qid, did in MLT_SOURCES:
        sub = got[got["qid"] == qid]
        assert did not in set(sub["doc_id"])
        assert len(sub) == MLT_K
        assert list(sub["rank"]) == list(range(1, MLT_K + 1))


def test_spell_suggest_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.flagship import (
        spell_suggest,
        spell_suggest_sql_oracle,
    )

    got = spell_suggest(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(spell_suggest_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the ambiguous fixture must produce BOTH its candidates, cf-ranked
    sp = got[got["qterm"] == "spart"].sort_values("rank")
    assert set(sp["suggestion"]) == {"spark", "part"}
    assert list(sp["cf"]) == sorted(sp["cf"], reverse=True)
    # no suggestions for the no-match fixture
    assert (got["qterm"] != "zzz").all()


def test_hybrid_search_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.flagship import (
        HYBRID_K,
        hybrid_search,
        hybrid_search_sql_oracle,
    )

    got = hybrid_search(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = con.sql(hybrid_search_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # each query yields a full fused top-k with contiguous ranks
    for qid in got["qid"].unique():
        sub = got[got["qid"] == qid]
        assert list(sub["rank"]) == list(range(1, HYBRID_K + 1))


def test_federated_bm25_bitwise_matches_single_index(ray_session):
    """Partition transparency: two lang-split indexes searched through
    FederatedBM25 must reproduce the fused single index bitwise — docIDs
    AND float64 scores — because (N, df, total_tokens) merge exactly."""
    from index_ray.pipelines.flagship import (
        DOC_QUERIES,
        documents_index,
        federated_bm25,
    )
    from index_ray.pipelines.query import BM25Searcher

    fed = federated_bm25(SF)  # also builds the partition indexes
    single = BM25Searcher(documents_index(SF))
    qs = [(" ".join(terms), k) for _, terms, k in DOC_QUERIES]
    singles = single.search_many(qs)

    # rebuild the federated raw results (with scores) for the comparison
    import glob as _glob
    import hashlib
    import os

    from index_ray.pipelines.query import FederatedBM25

    key = hashlib.sha1(os.path.abspath(SF).encode()).hexdigest()[:12]
    dirs = [f"/tmp/index_ray_docs_{key}_fed_en", f"/tmp/index_ray_docs_{key}_fed_rest"]
    f = FederatedBM25(dirs)
    feds = f.search_many(qs)
    for s, fr in zip(singles, feds):
        assert s["docID"].to_pylist() == fr["docID"].to_pylist()
        assert s["score"].to_pylist() == fr["score"].to_pylist()  # bitwise
    # and the projected driver-contract table is rank-identical
    got = fed.to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    assert len(got) == sum(min(k, len(s)) for (_, _, k), s in zip(DOC_QUERIES, singles))


def test_vector_index_exhaustive_equals_bruteforce(ray_session):
    from index_ray.pipelines.similarity import knn_cosine
    from index_ray.pipelines.vecindex import (
        VectorIndex,
        _index_dir_for,
        build_vector_index,
        vector_index_topk,
    )

    got = vector_index_topk(SF).to_pandas()
    want = knn_cosine(SF).to_pandas().rename(columns={})
    a = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    b = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert (a["vec_id"].to_numpy() == b["vec_id"].to_numpy()).all()
    assert (a["rank"].to_numpy() == b["rank"].to_numpy()).all()

    # resume: rebuilding is a manifest no-op
    out = _index_dir_for(SF)
    import json, os, time

    m0 = json.load(open(os.path.join(out, "vstats.json")))
    t0 = time.time()
    build_vector_index(SF, out)
    assert time.time() - t0 < 1.0
    assert json.load(open(os.path.join(out, "vstats.json"))) == m0
    assert m0["n_vectors"] == 500

    # approximate probe: recall@10 floor at nprobe=4 of 16
    import numpy as np

    from index_ray.pipelines.similarity import _query_matrix

    vi = VectorIndex(out)
    q, qids = _query_matrix(SF, [0, 1, 2])
    approx = vi.search_many(q, k=10, nprobe=4)
    exact = {qid: set(g) for qid, g in want.groupby("qid")["vec_id"]}
    recalls = [
        len(set(r["vec_id"].to_pylist()) & exact[qid]) / 10
        for qid, r in zip(qids, approx)
    ]
    assert min(recalls) >= 0.5, recalls


def test_index_filter_docs_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.flagship import (
        index_filter_docs,
        index_filter_sql_oracle,
    )

    got = index_filter_docs(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(index_filter_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # AND(qid 1) must be a subset of each single-term match set, and the
    # absent-term fixture empty
    assert (got["qid"] != 3).all()


def test_nb_lang_classify_planted_and_duckdb(ray_session, tmp_path):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.textstats import (
        nb_lang_classify,
        nb_lang_sql_oracle,
    )

    # perfectly separable: each lang has a private marker vocabulary
    texts, langs = [], []
    for lang, words in [("aa", "foo bar"), ("bb", "baz qux"), ("cc", "zap zig")]:
        for i in range(20):
            texts.append((words + " ") * 5 + f"shared{i % 3}")
            langs.append(lang)
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = nb_lang_classify(str(d)).to_pandas()
    # a separable corpus must classify perfectly: diagonal only
    assert (got["true_lang"] == got["predicted"]).all()
    assert got["n"].sum() == len(texts)

    # and on the driver testdata the confusion hash-matches DuckDB
    got2 = nb_lang_classify("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.sql(nb_lang_sql_oracle()).df()
    cols = sorted(got2.columns)
    a = got2[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_skipgram_counts_planted(ray_session, tmp_path):
    """window=2 pairs over a planted doc; no cross-document pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.text import skipgram_counts

    d = tmp_path / "sg"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b c a b", "b"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = (
        skipgram_counts(str(d), window=2, min_pair=1)
        .to_pandas()
        .set_index(["a", "b"])["n_pair"]
        .to_dict()
    )
    # doc1 tokens: a b c a b -> d1 pairs: ab,bc,ca,ab; d2: ac,ba,cb
    want = {
        ("a", "b"): 2, ("b", "c"): 1, ("c", "a"): 1,
        ("a", "c"): 1, ("b", "a"): 1, ("c", "b"): 1,
    }
    assert out == want


def test_top_terms_by_source_planted(ray_session, tmp_path):
    """Ties break term-ascending; k cuts per source independently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.text import top_terms_by_source

    d = tmp_path / "tts"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["b b a a c", "z z z y", "q"], pa.string()
                ),
                "source": pa.array(["s1", "s2", "s2"], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = (
        top_terms_by_source(str(d), k=2)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    rows = list(out.itertuples(index=False))
    assert [(r.source, r.rank, r.term, r.cf) for r in rows] == [
        ("s1", 1, "a", 2), ("s1", 2, "b", 2),  # tie 2-2 -> term asc
        ("s2", 1, "z", 3), ("s2", 2, "q", 1),  # q/y tie -> q wins
    ]


def test_bm25_explain_sums_to_engine_score(ray_session):
    """Per-term contributions (recomputed the explain way, unrounded) sum
    in term order to the shard scorer's score BITWISE for the explained
    docs — the explain surface and the scorer share one formula."""
    from collections import Counter

    import pyarrow as pa
    import pyarrow.dataset as pads

    from index_ray.functions.tokenize import split_tokens
    from index_ray.pipelines.flagship import DOC_QUERIES, documents_index, flagship
    from index_ray.pipelines.query import BM25Searcher

    sf = "/root/testdata/sf0.001"
    full = flagship(sf)
    searcher = BM25Searcher(documents_index(sf))
    n_checked = 0
    texts = dict(
        zip(
            *(
                pads.dataset(f"{sf}/documents.parquet")
                .to_table(columns=["doc_id", "text"])
                .to_pydict()
                .values()
            )
        )
    )
    avgdl = float(searcher.stats["avgdl"])
    by_q = {}
    for qid, rank, did, score in zip(*(full[c].to_pylist() for c in full.column_names)):
        if rank <= 3:
            by_q.setdefault(qid, []).append((did, score))
    for qid, terms, _ in DOC_QUERIES:
        weights = searcher.lexicon.idf(terms)
        for did, score in by_q.get(qid, []):
            toks = split_tokens(pa.array([texts[did]]), "simple")[0].as_py()
            tf = Counter(t for t in toks if t)
            dl = sum(tf.values())
            s = 0.0
            for t in terms:  # fixture terms are ascending == scorer order
                if t in weights and tf.get(t, 0):
                    idf = weights[t][1]
                    s += idf * (tf[t] * 2.2) / (
                        tf[t] + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
                    )
            assert s == score  # bitwise
            n_checked += 1
    assert n_checked >= 9


def test_minhash_probe_cross_batch(ray_session, tmp_path):
    """Persisted-index probe: new (odd-id) docs find their planted dups in
    the indexed (even-id) corpus without recomputing corpus signatures."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from index_ray.sources.corpus import generate_corpus

    tbl = generate_corpus(120, 42).rename_columns(
        ["repo", "path", "commit", "lang", "text"]
    ).append_column("doc_id", pa.array(np.arange(120), type=pa.int64()))
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    even_d = tmp_path / "even"
    even_d.mkdir()
    pq.write_table(tbl.filter(pa.array(ids % 2 == 0)), str(even_d / "documents.parquet"))
    odd_path = str(tmp_path / "odd.parquet")
    pq.write_table(tbl.filter(pa.array(ids % 2 == 1)), odd_path)

    idx = str(tmp_path / "mhidx")
    dedup.build_minhash_index(str(even_d), idx, mode="code")
    pairs = dedup.probe_minhash_index(
        idx, ray.data.read_parquet(odd_path, columns=["doc_id", "text"]), mode="code"
    ).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert all(a % 2 == 1 and b % 2 == 0 for a, b in got)
    # planted exact copies (i%50==1 copies i-1): all found
    assert (1, 0) in got and (51, 50) in got and (101, 100) in got
    # planted near dups (i%20==3 edits i-1): most found (short docs may
    # fall below the 0.90 threshold, same tolerance as minhash_dedup's test)
    planted = [(i, i - 1) for i in range(3, 120, 20)]
    found = sum(p in got for p in planted)
    assert found >= len(planted) - 2, (found, sorted(got)[:20])

    # rebuild is a no-op (fingerprint manifest)
    assert dedup.build_minhash_index(str(even_d), idx, mode="code") == idx


def test_quantize_embeddings_zero_vector_and_bounds(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "qe"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array(
                    [[0.0, 0.0, 0.0], [0.5, -1.0, 0.25]],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    out = sim.quantize_embeddings(str(d)).to_pandas()
    q = {(r.vec_id, r.dim): r.q for r in out.itertuples()}
    assert q[(1, 1)] == q[(1, 2)] == q[(1, 3)] == 0  # zero vector
    assert q[(2, 2)] == -127  # the max-|v| component hits the rail
    assert q[(2, 1)] == 64 and q[(2, 3)] == 32  # 63.5 / 31.75 round half-away


def test_top_terms_by_source_null_source_own_group(ray_session, tmp_path):
    """NULL-source docs must form their own group, not be misattributed."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.text import top_terms_by_source

    d = tmp_path / "ttsnull"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["apple apple", "pear"], pa.string()),
                "source": pa.array(["web", None], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = top_terms_by_source(str(d), k=5).to_pandas()
    by_src = {
        (None if pd.isna(r.source) else r.source, r.term): r.cf
        for r in out.itertuples()
    }
    assert by_src == {("web", "apple"): 2, (None, "pear"): 1}


def test_minhash_index_rebuild_on_changed_data(ray_session, tmp_path):
    """Regenerated source data at the same path must rebuild (mtime/size
    fingerprint) and must not leave stale band files behind."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    d = tmp_path / "src"
    d.mkdir()

    def write(ids_texts):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([i for i, _ in ids_texts], pa.int64()),
                    "text": pa.array([t for _, t in ids_texts], pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )

    long_a = " ".join(f"alpha{i}" for i in range(40))
    long_b = " ".join(f"beta{i}" for i in range(40))
    write([(1, long_a), (2, long_a)])
    idx = str(tmp_path / "idx")
    dedup.build_minhash_index(str(d), idx, mode="simple")
    p1 = dedup.probe_minhash_index(
        idx, ray.data.read_parquet(str(d / "documents.parquet")), mode="simple"
    )
    assert set(zip(p1["a"].to_pylist(), p1["b"].to_pylist())) == {(1, 2), (2, 1)}

    time.sleep(1.1)  # mtime granularity
    write([(7, long_b), (8, long_b)])
    dedup.build_minhash_index(str(d), idx, mode="simple")
    p2 = dedup.probe_minhash_index(
        idx, ray.data.read_parquet(str(d / "documents.parquet")), mode="simple"
    )
    got = set(zip(p2["a"].to_pylist(), p2["b"].to_pylist()))
    assert got == {(7, 8), (8, 7)}  # no stale doc 1/2 rows survive


def test_trigram_search_planted_fp_and_punctuation(ray_session, tmp_path):
    """A doc containing every trigram of the literal but NOT the literal
    itself (the classic trigram false positive) must be verified away;
    punctuation/space bytes inside the literal must match exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines import flagship as F

    d = tmp_path / "tri"
    d.mkdir()
    rows = [
        (1, "error: disk full"),            # true match for "error: disk"
        (2, "disk error: full rror: dis"),  # all trigrams, wrong order -> FP
        (3, "ERROR: DISK almost"),          # case-folded true match
        (4, "nothing relevant here"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    saved = F.TRI_QUERIES
    F.TRI_QUERIES = [(0, "error: disk")]
    try:
        got = F.trigram_search(str(d)).to_pandas()
    finally:
        F.TRI_QUERIES = saved
    assert got["doc_id"].tolist() == [1, 3]  # FP doc 2 verified away
    assert (got["qid"] == 0).all()


def test_trigram_regex_analyzer_and_pruning(ray_session):
    """The required-trigram analyzer must split on wildcards, OR across
    top-level alternation, and refuse what it cannot model."""
    from index_ray.pipelines.flagship import _regex_required_trigrams as rt

    assert rt("hash .*merge") == [
        sorted(set(__import__("index_ray.pipelines.flagship", fromlist=["x"])
                   ._literal_trigrams("hash ")
                   + __import__("index_ray.pipelines.flagship", fromlist=["x"])
                   ._literal_trigrams("merge")))
    ]
    assert len(rt("table part|table row")) == 2
    assert rt("agg (row|line) scan") is None      # grouping: unanalyzable
    assert rt("a.b") is None                      # no >=3-byte literal
    assert rt("x[yz]w") is None                   # character class


def test_mmr_rerank_semantics(ray_session):
    """MMR diversified rerank: first pick per query is the top BM25
    candidate, picks are distinct, and diversification actually reorders
    at least one query vs pure relevance order."""
    from index_ray.pipelines.flagship import (
        DOC_QUERIES, MMR_K, bm25_topk, mmr_rerank,
    )

    out = mmr_rerank(SF).to_pandas()
    base = bm25_topk(SF).to_pandas()
    assert (out.groupby("qid")["rank"].max() <= MMR_K).all()
    reordered = 0
    for qid, _terms, _k in DOC_QUERIES:
        m = out[out.qid == qid].sort_values("rank")["doc_id"].tolist()
        b = base[base.qid == qid].sort_values("rank")["doc_id"].tolist()
        assert len(m) == len(set(m))
        if not m:
            assert not b  # the no-match query stays empty
            continue
        assert m[0] == b[0]  # first pick = max relevance
        reordered += m != b
    assert reordered >= 1


def test_routed_bm25_single_partition_probe(ray_session):
    """Routing contract: a routed search is bitwise-identical to a
    standalone BM25Searcher over just that partition's index, every
    result doc belongs to the routing lang, and an unknown key raises."""
    import pytest as _pytest

    from index_ray.pipelines.flagship import _routed_indexes
    from index_ray.pipelines.query import BM25Searcher, RoutedBM25

    routes = _routed_indexes(SF)
    routed = RoutedBM25(routes)
    standalone = BM25Searcher(routes["en"])
    a = routed.search("en", "fast merge sort", k=10)
    b = standalone.search("fast merge sort", k=10)
    assert a["docID"].to_pylist() == b["docID"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()  # bitwise
    import duckdb as _duckdb

    en_ids = set(
        _duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet' WHERE lang='en'"
        ).df()["doc_id"]
    )
    assert set(a["docID"].to_pylist()) <= en_ids
    with _pytest.raises(KeyError):
        routed.search("tlh", "fast merge", k=5)


def test_bm25f_matches_bruteforce(ray_session, tmp_path):
    """Engine BM25F == a from-scratch python BM25F on a planted corpus,
    and it is a genuinely different ranking from the add-two-BM25-scores
    head boost (a doc stacking one term's fields must not outrank a doc
    covering more query terms)."""
    import math

    import numpy as _np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher

    texts = [
        "alpha beta gamma delta eps zeta eta theta body body",  # both terms
        "alpha alpha alpha alpha alpha alpha alpha alpha alpha alpha",
        "beta filler filler filler filler filler alpha filler",
        "gamma filler alpha beta filler filler filler filler",
        "filler filler filler filler filler filler filler filler",
    ]
    d = tmp_path / "f"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "f_idx")
    H, WH, WB, K1, B = 4, 2.0, 1.0, 1.2, 0.75
    build_index(
        str(d / "docs.parquet"),
        idx,
        BuildConfig(
            tokenizer="simple", text_col="text", id_col="doc_id",
            chunk_docs=100, num_parts=4, salt_docs=64, head_tokens=H,
        ),
    )
    s = BM25Searcher(idx)
    got = s.search_many_f([("alpha beta", 5)], w_head=WH, w_body=WB)[0]

    toks = [t.split() for t in texts]
    n = len(toks)
    dl = [len(t) for t in toks]
    avg_h = sum(min(x, H) for x in dl) / n
    avg_b = (sum(dl) - sum(min(x, H) for x in dl)) / n
    want = {}
    for term in ["alpha", "beta"]:
        df = sum(term in t for t in toks)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, t in enumerate(toks):
            tf_h = t[:H].count(term)
            tf_b = t[H:].count(term)
            if tf_h + tf_b == 0:
                continue
            Bh = (1 - B) + B * min(dl[i], H) / avg_h
            Bb = (1 - B) + B * (dl[i] - min(dl[i], H)) / avg_b
            tfw = WB * tf_b / Bb + WH * tf_h / Bh
            want[i] = want.get(i, 0.0) + idf * (tfw * (K1 + 1)) / (tfw + K1)
    order = sorted(want, key=lambda i: (-want[i], i))
    assert got["docID"].to_pylist() == order
    assert _np.allclose(got["score"].to_numpy(), [want[i] for i in order],
                        rtol=0, atol=1e-12)
    # doc 0 (covers both terms) must beat doc 1 (stacks alpha in head+body)
    assert order[0] == 0
    # and the API guards: no head namespace -> clear error
    idx2 = str(tmp_path / "nohead_idx")
    build_index(
        str(d / "docs.parquet"),
        idx2,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        BM25Searcher(idx2).search_many_f([("alpha", 3)])


def test_phrase_suggest_ranks_by_bigram_support(ray_session, tmp_path):
    """Whole-phrase correction: the candidate phrase with the higher
    adjacent-bigram corpus support must rank first (and the score is the
    exact bigram count sum)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    import index_ray.pipelines.flagship as fl

    texts = (["slow table scan runs nightly"] * 5) + ["row table scan once"]
    d = tmp_path / "ps"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    old = fl.PHRASE_SUGGEST_QUERIES
    fl.PHRASE_SUGGEST_QUERIES = [(1, "sow tabl scan")]
    try:
        got = fl.phrase_suggest(str(d)).to_pandas()
    finally:
        fl.PHRASE_SUGGEST_QUERIES = old
    rows = list(zip(got["rank"], got["suggestion"], got["score"]))
    # slow: 'slow table' x5 + 'table scan' x6 = 11; row: 1 + 6 = 7
    assert rows[0] == (1, "slow table scan", 11)
    assert rows[1] == (2, "row table scan", 7)


def test_nrt_bitwise_matches_fused_index(ray_session, tmp_path):
    """NRT contract: durable half + buffered half must reproduce the fused
    single index bitwise (docIDs AND float64 scores); after flush() the
    same queries still match (buffer drained to a real chunk)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from conftest import TINY_CFG, TINY_SEED
    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher, NRTSearcher
    from index_ray.sources.corpus import generate_corpus

    texts = generate_corpus(150, TINY_SEED)["content"].to_pylist()
    ids = np.arange(150, dtype=np.int64)
    tbl = pa.table(
        {"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}
    )
    d = tmp_path / "nrt"
    d.mkdir()
    even = ids % 2 == 0
    _pq.write_table(tbl.filter(pa.array(even)), str(d / "even.parquet"))
    _pq.write_table(tbl, str(d / "all.parquet"))
    cfg = BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                      **TINY_CFG)
    idx = str(tmp_path / "nrt_idx")
    build_index(str(d / "even.parquet"), idx, cfg)
    fused_idx = str(tmp_path / "fused_idx")
    build_index(str(d / "all.parquet"), fused_idx, cfg)

    nrt = NRTSearcher(idx, text_col="text", id_col="doc_id")
    assert nrt.buffered_docs == 0
    nrt.add(tbl.filter(pa.array(~even)))
    assert nrt.buffered_docs == int((~even).sum())
    fused = BM25Searcher(fused_idx)
    qs = [("fast merge sort", 10), ("spark query", 10), ("window scan", 10)]
    for n_r, f_r in zip(nrt.search_many(qs), fused.search_many(qs)):
        assert n_r["docID"].to_pylist() == f_r["docID"].to_pylist()
        assert n_r["score"].to_pylist() == f_r["score"].to_pylist()  # bitwise

    nrt.flush(cfg)
    assert nrt.buffered_docs == 0
    for n_r, f_r in zip(nrt.search_many(qs), fused.search_many(qs)):
        assert n_r["docID"].to_pylist() == f_r["docID"].to_pylist()
        assert n_r["score"].to_pylist() == f_r["score"].to_pylist()


def test_function_score_boosts_by_value(ray_session, tmp_path):
    """field_value_factor: the factor must be able to flip raw-BM25 order
    (a long doc with lower raw score overtakes), and equal-factor docs
    keep the raw order."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher

    texts = [
        "alpha alpha alpha pad",              # high raw tf, tiny n_chars
        "alpha " + "filler " * 200,           # low raw tf, huge n_chars
    ]
    d = tmp_path / "fs"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "fs_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    s = BM25Searcher(idx)
    raw = s.search("alpha", k=2)
    fs = s.search_function("alpha", k=2, value_col="n_chars", scale=10.0)
    assert raw["docID"].to_pylist()[0] == 0       # tf wins raw
    assert fs["docID"].to_pylist()[0] == 1        # length prior flips it
    # exact factor arithmetic
    for rank, doc in enumerate(fs["docID"].to_pylist()):
        rs = dict(zip(raw["docID"].to_pylist(), raw["score"].to_pylist()))[doc]
        f = 1.0 + math.log(1.0 + len(texts[doc]) / 10.0)
        assert fs["score"].to_pylist()[rank] == rs * f


def test_query_cache_hits_and_state_invalidation(ray_session, tmp_path, monkeypatch):
    """A repeated query is served from the cache (no shard fan-out); a
    delete commits a new state and the same query re-executes against the
    post-delete index."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from conftest import TINY_CFG, TINY_SEED
    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.compact import delete_docs
    from index_ray.pipelines.query import BM25Searcher, QueryCache
    from index_ray.sources.corpus import generate_corpus

    texts = generate_corpus(80, TINY_SEED)["content"].to_pylist()
    d = tmp_path / "qc"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(80), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "qc_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    **TINY_CFG),
    )
    s = BM25Searcher(idx)
    cache = QueryCache(s, capacity=8)
    a = cache.search("fast merge", k=10)
    calls = []
    orig = s.search
    monkeypatch.setattr(s, "search", lambda *al, **kw: calls.append(1) or orig(*al, **kw))
    b = cache.search("fast merge", k=10)
    assert calls == [] and cache.hits == 1  # pure cache hit
    assert a["docID"].to_pylist() == b["docID"].to_pylist()

    victim = a["docID"].to_pylist()[0]
    delete_docs(idx, [victim])
    s2 = BM25Searcher(idx)  # reader over the new commit
    cache.searcher = s2
    c = cache.search("fast merge", k=10)
    assert cache.misses == 2  # state key changed -> re-executed
    assert victim not in c["docID"].to_pylist()


def test_knn_filtered_prefilter_semantics(ray_session):
    """Pre-filter: every hit belongs to the filter lang, k survivors come
    back even when the global top-k is dominated by other langs, and the
    result equals brute-force cosine over the restricted set."""
    import duckdb as _duckdb

    from index_ray.pipelines.similarity import knn_filtered

    got = knn_filtered(SF, lang="de").to_pandas()
    con = _duckdb.connect()
    de_ids = set(
        con.sql(f"SELECT doc_id FROM '{SF}/documents.parquet' WHERE lang='de'").df()["doc_id"]
    )
    assert set(got["vec_id"]) <= de_ids
    want = con.sql(f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe
                   FROM '{SF}/embeddings.parquet' WHERE vec_id IN (0,1,2)),
        d AS (SELECT doc_id FROM '{SF}/documents.parquet' WHERE lang='de'),
        s AS (SELECT q.qid, e.vec_id, list_cosine_similarity(q.qe, e.embedding) sim
              FROM q CROSS JOIN '{SF}/embeddings.parquet' e
              JOIN d ON d.doc_id = e.vec_id)
        SELECT qid, vec_id FROM (
          SELECT qid, vec_id, row_number() OVER (
            PARTITION BY qid ORDER BY sim DESC, vec_id ASC) r FROM s)
        WHERE r <= 10 ORDER BY qid, r
    """).df()
    got_s = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert list(got_s["vec_id"]) == list(want["vec_id"])


def test_nrt_add_is_insert_only(ray_session, tmp_path):
    """Re-adding a buffered doc_id (or duplicating one within a batch)
    raises instead of double-counting it in the merged N/df/avgdl."""
    import pyarrow as pa
    import pyarrow.parquet as _pq
    import pytest as _pytest

    from conftest import TINY_CFG, TINY_SEED
    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import NRTSearcher
    from index_ray.sources.corpus import generate_corpus

    texts = generate_corpus(40, TINY_SEED)["content"].to_pylist()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "nrt_ins"
    d.mkdir()
    _pq.write_table(tbl.slice(0, 20), str(d / "base.parquet"))
    idx = str(tmp_path / "nrt_ins_idx")
    build_index(
        str(d / "base.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    **TINY_CFG),
    )
    nrt = NRTSearcher(idx, text_col="text", id_col="doc_id")
    nrt.add(tbl.slice(20, 10))
    with _pytest.raises(ValueError, match="insert-only"):
        nrt.add(tbl.slice(25, 5))  # 25..29 already buffered
    dup = pa.concat_tables([tbl.slice(30, 2), tbl.slice(30, 2)])
    with _pytest.raises(ValueError, match="duplicate"):
        nrt.add(dup)
    assert nrt.buffered_docs == 10  # failed adds buffered nothing


def test_query_cache_rollback_same_cardinality_not_stale(
    ray_session, tmp_path
):
    """The stale-key trap: delete doc A, roll back, delete doc B — the
    tombstone FILENAME and stats.json are identical in both states, so a
    basename-only cache key would serve A-state results for the B-state
    index.  The key hashes tombstone contents, so the second delete must
    re-execute and exclude B."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from conftest import TINY_CFG, TINY_SEED
    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.compact import delete_docs
    from index_ray.pipelines.query import BM25Searcher, QueryCache
    from index_ray.sources.corpus import generate_corpus
    from index_ray.state.snapshots import rollback_to_snapshot, snapshot_index

    texts = generate_corpus(60, TINY_SEED)["content"].to_pylist()
    d = tmp_path / "qcr"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(60), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "qcr_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    **TINY_CFG),
    )
    v = snapshot_index(idx)
    base = BM25Searcher(idx).search("fast merge", k=10)["docID"].to_pylist()
    assert len(base) >= 2
    a, b = base[0], base[1]

    cache = QueryCache(BM25Searcher(idx), capacity=8)
    delete_docs(idx, [a])
    cache.searcher = BM25Searcher(idx)
    r1 = cache.search("fast merge", k=10)
    assert a not in r1["docID"].to_pylist()

    rollback_to_snapshot(idx, v)
    delete_docs(idx, [b])  # same cardinality -> same tomb filename
    cache.searcher = BM25Searcher(idx)
    r2 = cache.search("fast merge", k=10)
    assert b not in r2["docID"].to_pylist()  # stale A-state would keep b
    assert a in r2["docID"].to_pylist()
    assert cache.misses == 2  # both states executed, nothing served stale
    # memo hygiene: the rollback deleted A-state's tombstone file, so its
    # entry must be evicted — only files seen by the latest glob survive
    # (a long-lived process cycling deletes/rollbacks stays bounded)
    import glob as _glob
    import os

    live_tombs = set(_glob.glob(os.path.join(idx, "tombstones", "*.parquet")))
    assert {k[0] for k in cache._tomb_hash_memo} <= live_tombs
    assert len(cache._tomb_hash_memo) == len(live_tombs)


def test_audio_pcma_roundtrip_and_stub():
    import pytest as _pytest

    from index_ray.pipelines.multimodal import decode_pcma, encode_pcma

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, 2_000).astype("int16")
    payload = encode_pcma(s, 16000, 2)
    got, rate, ch = decode_pcma(payload)
    assert (got == s).all() and rate == 16000 and ch == 2
    with _pytest.raises(NotImplementedError, match="STUB"):
        decode_pcma(b"RIFF....WAVE")  # real WAV stays honestly stubbed


def test_audio_features_matches_scalar_recompute(ray_session):
    from index_ray.pipelines.multimodal import audio_features, decode_pcma, synth_audio_table

    out = audio_features(None, n=40).to_pandas().set_index("media_id")
    t = synth_audio_table(40)
    for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
        s, rate, ch = decode_pcma(payload)
        s = s.astype("int64")
        n = len(s) // ch
        c0 = s[::ch].tolist()
        zc = sum(1 for a, b in zip(c0, c0[1:]) if (a >= 0) != (b >= 0))
        row = out.loc[mid]
        assert row["duration_us"] == n * 1_000_000 // rate
        assert row["peak"] == max(abs(int(x)) for x in s)
        assert row["zero_crossings"] == zc
        assert row["energy"] == sum(int(x) * int(x) for x in s)


def test_dismax_best_field_semantics(ray_session, tmp_path):
    """dis_max = max(w_h*S_head, w_b*S_body) + tie*min: a doc whose query
    term sits in the head must outrank a doc with the same body tf but no
    head occurrence, and the combined score must equal the brute-force
    recompute from the two subquery score lists."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as _pq

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher

    texts = [
        "needle pad pad pad pad pad pad pad pad pad",     # head hit
        "pad pad pad pad pad pad pad pad needle needle",  # body-only, tf 2
        "filler words only here nothing else at all",
    ]
    d = tmp_path / "dm"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "docs.parquet"),
    )
    idx = str(tmp_path / "dm_idx")
    build_index(
        str(d / "docs.parquet"), idx,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64, head_tokens=8),
    )
    s = BM25Searcher(idx)
    body = s.search("needle", k=100)
    head = s.search("needle", k=100, field="head")
    sb = dict(zip(body["docID"].to_pylist(), body["score"].to_pylist()))
    sh = dict(zip(head["docID"].to_pylist(), head["score"].to_pylist()))
    assert set(sb) == {0, 1} and set(sh) == {0}
    w_h, w_b, tie = 2.0, 1.0, 0.3
    dm = {}
    for doc in sb:
        a, b = w_h * sh.get(doc, 0.0), w_b * sb[doc]
        dm[doc] = max(a, b) + tie * min(a, b)
    # head hit wins despite the body-only doc's higher tf
    assert dm[0] > dm[1]
    assert math.isclose(dm[0], max(w_h * sh[0], w_b * sb[0]) + tie * min(w_h * sh[0], w_b * sb[0]))
    # field="head" on a non-head index still raises
    import pytest as _pytest

    idx2 = str(tmp_path / "dm_idx2")
    build_index(
        str(d / "docs.parquet"), idx2,
        BuildConfig(tokenizer="simple", text_col="text", id_col="doc_id",
                    chunk_docs=100, num_parts=4, salt_docs=64),
    )
    with _pytest.raises(ValueError, match="field_col"):
        BM25Searcher(idx2).search("needle", field="head")
