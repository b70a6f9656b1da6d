"""Unit tests for the curation operators (repetition / redaction /
quality-filter / stratified sampling) on planted inputs the driver corpus
never exercises (emails, IPs, heavy repetition, empty docs)."""

import hashlib

import numpy as np
import pyarrow as pa

from index_ray.pipelines.curation import (
    SAMPLE_RATES,
    QualityFilterStage,
    RedactStage,
    RepetitionStage,
    StratifiedSampleStage,
)


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


def test_repetition_planted():
    out = RepetitionStage()(
        _docs(
            [
                "a b a b a b a b",  # "a b" bigram dominates
                "one two three four five",  # all grams distinct
                "",  # no tokens
                "solo",  # 1 token: no grams
            ]
        )
    ).to_pydict()
    assert out["n_tokens"] == [8, 5, 0, 1]
    assert out["n_bigrams"] == [7, 4, 0, 0]
    # "a b" appears at positions 0,2,4,6 -> 4 times; doc 1 all distinct
    assert out["top_bigram_count"] == [4, 1, 0, 0]
    assert out["n_trigrams"] == [6, 3, 0, 0]
    # trigram types: "a b a" (x3), "b a b" (x3) -> 2 distinct of 6
    assert out["distinct_trigrams"] == [2, 3, 0, 0]


def test_repetition_matches_bruteforce():
    rng = np.random.default_rng(7)
    words = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 30)).tolist())
        for _ in range(50)
    ]
    out = RepetitionStage()(_docs(texts)).to_pydict()
    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        tg = [tuple(toks[j : j + 3]) for j in range(max(len(toks) - 2, 0))]
        bg = [tuple(toks[j : j + 2]) for j in range(max(len(toks) - 1, 0))]
        assert out["n_trigrams"][i] == len(tg)
        assert out["distinct_trigrams"][i] == len(set(tg))
        top = max((bg.count(g) for g in set(bg)), default=0)
        assert out["top_bigram_count"][i] == top


def test_redact_planted():
    out = RedactStage()(
        _docs(
            [
                "contact bob@example.com or alice@test.org now",
                "server at 10.0.0.1 and 192.168.1.255 up",
                "the key of the hash is key",
                "clean text only",
            ]
        )
    ).to_pydict()
    assert out["n_emails"] == [2, 0, 0, 0]
    assert out["n_ipv4"] == [0, 2, 0, 0]
    assert out["n_terms"] == [0, 0, 3, 0]
    assert (
        out["redacted_sha256"][0]
        == hashlib.sha256(b"contact <EMAIL> or <EMAIL> now").hexdigest()
    )
    assert (
        out["redacted_sha256"][2]
        == hashlib.sha256(b"the <TOK> of the <TOK> is <TOK>").hexdigest()
    )
    assert out["redacted_sha256"][3] == hashlib.sha256(b"clean text only").hexdigest()


def test_quality_filter_flags():
    long_ok = " ".join(["the"] + ["word%d" % i for i in range(40)])
    too_short = "the cat"
    no_stop = " ".join("tok%d" % i for i in range(40))
    repetitive = " ".join(["the"] * 5 + ["dup"] * 45)  # TTR 2/50 < 0.15
    out = QualityFilterStage()(
        _docs([long_ok, too_short, no_stop, repetitive])
    ).to_pydict()
    assert out["keep"] == [1, 0, 0, 0]
    assert out["len_ok"] == [1, 0, 1, 1]
    assert out["stop_ok"] == [1, 1, 0, 1]
    assert out["uniq_ok"] == [1, 1, 1, 0]


def test_stratified_sample_deterministic_and_rated():
    n = 4000
    batch = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array(
                [sorted(SAMPLE_RATES)[i % len(SAMPLE_RATES)] for i in range(n)]
            ),
        }
    )
    a = StratifiedSampleStage()(batch)
    b = StratifiedSampleStage()(batch)
    assert a.equals(b)  # deterministic in doc_id
    d = a.to_pydict()
    assert all(bk < SAMPLE_RATES[lg] for bk, lg in zip(d["bucket"], d["lang"]))
    # realized rate within 5pp of target per lang (md5 is uniform)
    for lang, rate in SAMPLE_RATES.items():
        total = sum(1 for i in range(n) if batch["lang"][i].as_py() == lang)
        kept = sum(1 for lg in d["lang"] if lg == lang)
        assert abs(100 * kept / total - rate) < 5


def test_decontaminate_planted():
    """An exact copy of a benchmark doc is 100% contaminated; a doc with
    half its grams shared is ~50%; a disjoint doc is never flagged."""
    from index_ray.pipelines.curation import (
        DECONTAM_MOD,
        DECONTAM_THRESHOLD,
        _BenchGramStage,
        _ContaminationStage,
    )
    import ray

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    half_text = "alpha beta gamma delta quux corge grault garply waldo fred"
    clean_text = "one two three four five six seven eight nine"
    # doc 0 is the benchmark (0 % MOD == 0); others are the corpus
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([bench_text, bench_text, half_text, clean_text]),
        }
    )
    bench_grams = _BenchGramStage()(batch)["gram"].to_numpy().view(np.uint64)
    ref = ray.put(np.unique(bench_grams))
    out = _ContaminationStage(ref)(batch).to_pydict()
    by_id = dict(zip(out["doc_id"], out["contamination_pct"]))
    assert by_id[1] == 100          # exact benchmark copy
    assert 20 <= by_id.get(2, 0) <= 60  # partially overlapping doc
    assert 3 not in by_id           # disjoint doc never flagged
    assert all(p >= DECONTAM_THRESHOLD for p in out["contamination_pct"])


def test_epoch_mix_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.curation import epoch_mix, epoch_mix_sql_oracle

    got = epoch_mix("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.sql(epoch_mix_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # src0 upsampled (2 or 3 copies per doc), src2 dropped entirely
    per = got.groupby("source")["copy"].max()
    assert per.get("src0", 0) >= 1
    assert "src2" not in set(got["source"])


def test_bloom_filter_contract():
    """Zero false negatives ever; false-positive rate near the design point
    (~1.2% at 10 bits/key, 4 probes)."""
    from index_ray.pipelines.curation import bloom_build, bloom_probe

    rng = np.random.default_rng(7)
    members = rng.integers(0, 1 << 63, 20_000, dtype=np.uint64)
    others = rng.integers(0, 1 << 63, 50_000, dtype=np.uint64)
    others = others[~np.isin(others, members)]
    words, mask = bloom_build(members)
    assert bloom_probe(words, mask, members).all()  # no false negatives
    fp = bloom_probe(words, mask, others).mean()
    assert fp < 0.05, fp
    # empty and tiny sets don't crash and stay sound
    w0, m0 = bloom_build(np.empty(0, np.uint64))
    assert not bloom_probe(w0, m0, members[:10]).any() or True  # may FP, never raises
    w1, m1 = bloom_build(members[:1])
    assert bloom_probe(w1, m1, members[:1]).all()


def test_decontaminate_bloom_row_identical(ray_session):
    """The Bloom two-tier path returns exactly the exact pass's rows."""
    import pandas as pd

    from index_ray.pipelines.curation import decontaminate, decontaminate_bloom

    a = decontaminate("/root/testdata/sf0.001").to_pandas()
    b = decontaminate_bloom("/root/testdata/sf0.001").to_pandas()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0  # the planted eval split does contaminate sf0.001


def test_uniform_sample_bottomk_merge_invariance(ray_session):
    """Sample == global bottom-k regardless of batching; k > N returns all."""
    from index_ray.functions.minhash import md5_strings
    from index_ray.pipelines.curation import uniform_sample

    got = uniform_sample("/root/testdata/sf0.001", k=50).to_pydict()
    assert len(got["doc_id"]) == 50
    assert len(set(got["doc_id"])) == 50  # without replacement
    import pyarrow.parquet as pq

    all_ids = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_pylist()
    pr = md5_strings([str(i) for i in all_ids])
    order = np.argsort(pr, kind="stable")[:50]
    assert got["doc_id"] == [all_ids[i] for i in order]
    # k past the corpus size degrades to the full table
    big = uniform_sample("/root/testdata/sf0.001", k=10**9)
    assert big.num_rows == len(all_ids)


def test_curate_corpus_funnel_and_sink(ray_session, tmp_path):
    """Funnel counts vs DuckDB on sf0.001; the sink holds exactly n_kept
    docs per language under lang=<l>/ partition directories."""
    import os

    import duckdb
    import pandas as pd
    import pyarrow.dataset as pads

    from index_ray.pipelines.curation import curate_corpus, curate_corpus_sql_oracle

    out_dir = str(tmp_path / "curated")
    got = curate_corpus("/root/testdata/sf0.001", out_dir=out_dir).to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.sql(curate_corpus_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # funnel is monotone
    assert (got["n_input"] >= got["n_quality"]).all()
    assert (got["n_quality"] >= got["n_dedup"]).all()
    assert (got["n_dedup"] >= got["n_kept"]).all()
    assert got["n_kept"].sum() > 0
    # sink: one partition dir per language, row counts == n_kept
    sunk = pads.dataset(out_dir, partitioning="hive").to_table().to_pandas()
    per = sunk.groupby("lang").size().to_dict()
    for _, row in got.iterrows():
        assert per.get(row["lang"], 0) == row["n_kept"], row["lang"]
    assert sorted(os.listdir(out_dir)) == sorted(
        f"lang={l}" for l in got[got["n_kept"] > 0]["lang"]
    )


def test_curate_corpus_refuses_existing_out_dir(ray_session, tmp_path):
    from index_ray.pipelines.curation import curate_corpus

    existing = tmp_path / "already_there"
    existing.mkdir()
    import pytest

    with pytest.raises(FileExistsError, match="already exists"):
        curate_corpus("/root/testdata/sf0.001", out_dir=str(existing))


def test_sequence_pack_matches_duckdb():
    import duckdb

    from index_ray.pipelines.curation import sequence_pack, sequence_pack_sql_oracle

    got = (
        sequence_pack("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = (
        con.execute(sequence_pack_sql_oracle())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["doc_id", "n_tokens", "tok_start", "seq_first", "seq_last"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # packing invariants: offsets are the exclusive cumsum; some doc crosses
    # a boundary iff total tokens > seq_len
    n = got["n_tokens"].to_numpy()
    assert (got["tok_start"].to_numpy() == n.cumsum() - n).all()
    if n.sum() > 2048:
        assert (got["seq_last"] > got["seq_first"]).any()


def test_sequence_pack_boundary_micro(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.curation import sequence_pack

    d = tmp_path / "docs"
    d.mkdir()
    # 3-token docs with seq_len=4: doc1 spans sequences 0-1, doc3 spans 1-2;
    # the empty doc is dropped
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c", "d e f", "g h i", "   "],
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    got = sequence_pack(str(d), seq_len=4).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got["tok_start"].tolist() == [0, 3, 6]
    assert got["seq_first"].tolist() == [0, 0, 1]
    assert got["seq_last"].tolist() == [0, 1, 2]


def test_ordered_prefix_sum_many_blocks():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from index_ray.util import ordered_prefix_sum

    rng = np.random.default_rng(0)
    ids = rng.permutation(5000)
    vals = rng.integers(0, 100, 5000)
    ds = ray.data.from_arrow(
        pa.table({"k": ids, "v": vals})
    ).repartition(13)
    out = ordered_prefix_sum(ds, "k", "v", "run").to_pandas().sort_values("k")
    order = np.argsort(ids)
    want = np.cumsum(vals[order]) - vals[order]
    assert (out["run"].to_numpy() == want).all()


def test_code_stats_planted():
    from index_ray.pipelines.curation import CodeStatsStage

    out = CodeStatsStage()(
        _docs(
            [
                "short line\nanother line",          # clean
                "x" * 1500,                           # one huge line
                "0123456789 " * 30,                   # digit-heavy
                ".... !!!! ;;;;",                     # low alnum
                "",                                   # empty: 1 empty line
                "línea üñí\n日本語テキスト",            # unicode codepoints
            ]
        )
    ).to_pydict()
    assert out["n_lines"] == [2, 1, 1, 1, 1, 2]
    assert out["max_line_len"] == [12, 1500, 330, 14, 0, 9]
    # docs 1, 2: single line over the 100-char average cap
    assert out["line_ok"] == [1, 0, 0, 1, 1, 1]
    # doc 3 all punctuation; doc 5 non-ASCII letters don't count as alnum
    assert out["alnum_ok"] == [1, 1, 1, 0, 1, 0]
    # doc 2: 300 digits of 330 chars -> 100*300 > 50*330 -> digit_ok 0
    assert out["digit_ok"] == [1, 1, 0, 1, 1, 1]
    assert out["keep"] == [1, 0, 0, 0, 1, 0]


def test_code_stats_matches_duckdb():
    import duckdb

    from index_ray.pipelines.curation import CodeStatsStage, code_stats_sql_oracle

    rng = np.random.default_rng(11)
    pieces = ["def f(x):", "  return x + 1", "", "#" * 120, "0xDEADBEEF " * 9,
              "word " * 40, "\t\t{}[]()", "ünïcodé 日本語"]
    texts = [
        "\n".join(rng.choice(pieces, size=rng.integers(1, 8)).tolist())
        for _ in range(80)
    ]
    docs = _docs(texts)
    ours = CodeStatsStage()(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    theirs = con.sql(code_stats_sql_oracle()).df().sort_values("doc_id").reset_index(drop=True)
    for c in ours.columns:
        assert (ours[c].to_numpy() == theirs[c].to_numpy()).all(), c


def test_split_leakage_matches_bruteforce(ray_session, tmp_path):
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.curation import split_leakage

    # texts engineered so identical content crosses split boundaries:
    # every 10th doc shares text "dup-block"
    texts = [("dup-block" if i % 10 == 0 else f"unique text {i}") for i in range(300)]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = split_leakage(str(d)).to_pandas().set_index("split")

    def split_of(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 90 else ("valid" if b < 95 else "test")

    splits = {i: split_of(i) for i in range(len(texts))}
    train_texts = {texts[i] for i, s in splits.items() if s == "train"}
    for name in ("valid", "test"):
        ids = [i for i, s in splits.items() if s == name]
        leaked = [i for i in ids if texts[i] in train_texts]
        assert out.loc[name, "n_docs"] == len(ids)
        assert out.loc[name, "n_leaked_docs"] == len(leaked)
    # the engineered dup-block must actually leak somewhere
    assert out["n_leaked_docs"].sum() > 0


def test_global_row_number_ntile_matches_duckdb(ray_session):
    """Exercise the ntile remainder math (n % b != 0) and n < b, which the
    500-row testdata (500 % 10 == 0) never hits."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from index_ray.util import global_row_number

    rng = np.random.default_rng(7)
    for n, b in [(303, 10), (7, 10), (64, 3), (1, 5)]:
        vals = rng.integers(0, 50, n)  # heavy ties: tiebreak column matters
        t = pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(vals.astype(np.int64)),
            }
        )
        got = (
            global_row_number(
                ray.data.from_arrow(t).repartition(4),
                ["v", "id"],
                [True, False],
                out_col="rn",
                ntiles=b,
                tile_col="tile",
            )
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", t)
        want = con.sql(
            f"""SELECT id, v,
                   CAST(row_number() OVER (ORDER BY v DESC, id ASC) AS BIGINT) AS rn,
                   CAST(ntile({b}) OVER (ORDER BY v DESC, id ASC) AS BIGINT) AS tile
                FROM t ORDER BY rn"""
        ).df()
        for c in ("id", "v", "rn", "tile"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), (n, b, c)


def test_quality_deciles_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from index_ray.pipelines.curation import (
        quality_deciles,
        quality_deciles_sql_oracle,
    )

    got = quality_deciles("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.sql(quality_deciles_sql_oracle()).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_weighted_sample_excludes_zero_weight_and_matches_oracle(
    ray_session, tmp_path
):
    """Zero-length docs never sampled; ranking matches the A-ES oracle."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.pipelines.curation import (
        weighted_sample,
        weighted_sample_sql_oracle,
    )

    d = tmp_path / "wsamp"
    d.mkdir()
    rng = np.random.default_rng(7)
    n = 500
    w = rng.integers(0, 2000, n)
    w[::50] = 0  # planted zero-weight docs
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "n_chars": pa.array(w.astype(np.int64)),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = weighted_sample(str(d), k=40)["doc_id"].to_pylist()
    assert not any(gid % 50 == 0 and w[gid] == 0 for gid in got)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = con.sql(weighted_sample_sql_oracle(k=40)).df()["doc_id"].tolist()
    assert got == want
