"""Brute-force-verified tests for the round-3 training-data ops:
corpus-global line dedup, unigram-LM scoring, md5 hash split."""

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts):
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
    return str(d)


def _rand_texts(n, seed):
    rng = np.random.default_rng(seed)
    lines = [
        "import os", "def main():", "    return 0", "# license header",
        "x = 1", "", "print(x)", "class Foo:", "    pass",
    ]
    return [
        "\n".join(rng.choice(lines, size=rng.integers(0, 8)).tolist())
        for _ in range(n)
    ]


def test_line_dedup_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.dedup import line_dedup

    texts = _rand_texts(60, 11)
    sf = _write_docs(tmp_path, texts)
    out = line_dedup(sf).to_pandas().set_index("doc_id")

    seen = set()
    for did, t in enumerate(texts):
        ls = t.split("\n")
        kept = [l for l in ls if (l not in seen) and not seen.add(l)]
        row = out.loc[did]
        assert row["n_lines"] == len(ls), did
        assert row["n_kept"] == len(kept), did
        assert row["kept_chars"] == sum(len(l) for l in kept), did
    assert len(out) == len(texts)


def test_line_dedup_first_occurrence_is_doc_order(ray_session, tmp_path):
    # the SAME line in doc 0 and doc 5: only doc 0 keeps it
    from index_ray.pipelines.dedup import line_dedup

    sf = _write_docs(tmp_path, ["dup\nunique0", "dup\nunique5"])
    out = line_dedup(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[1, "n_kept"] == 1  # "dup" already seen in doc 0
    assert out.loc[1, "kept_chars"] == len("unique5")


def test_lm_score_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.textstats import lm_score

    texts = [
        "the cat sat on the mat",
        "the the the cat",
        "dog",
        "",  # token-less: omitted from output
        "!!!",  # token-less after the simple tokenizer
    ]
    sf = _write_docs(tmp_path, texts)
    out = lm_score(sf).to_pandas().set_index("doc_id")

    tok = lambda s: [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
    all_toks = [t for s in texts for t in tok(s)]
    total = len(all_toks)
    cf = {}
    for t in all_toks:
        cf[t] = cf.get(t, 0) + 1
    assert set(out.index) == {0, 1, 2}  # docs 3,4 token-less
    for did in [0, 1, 2]:
        toks = tok(texts[did])
        exp = sum(np.log2(cf[t] / total) for t in toks)
        assert out.loc[did, "n_tokens"] == len(toks)
        assert abs(out.loc[did, "sum_log2p"] - exp) < 1e-9
        assert abs(out.loc[did, "avg_log2p"] - exp / len(toks)) < 1e-9


def test_lm_score_top_v_floor(ray_session, tmp_path):
    # with top_v=1 only the most frequent term keeps its true logp;
    # everything else scores at the OOV floor log2(1/total)
    from index_ray.pipelines.textstats import lm_score

    sf = _write_docs(tmp_path, ["aa aa aa bb", "bb cc"])
    out = lm_score(sf, top_v=1).to_pandas().set_index("doc_id")
    total = 6
    floor = np.log2(1 / total)
    exp0 = 3 * np.log2(3 / total) + floor  # aa kept, bb floored
    assert abs(out.loc[0, "sum_log2p"] - exp0) < 1e-9
    assert abs(out.loc[1, "sum_log2p"] - 2 * floor) < 1e-9


def test_hash_split_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.curation import hash_split

    texts = _rand_texts(300, 5)
    sf = _write_docs(tmp_path, texts)
    out = hash_split(sf).to_pandas().set_index("split")

    buckets = {"train": [], "valid": [], "test": []}
    for did, t in enumerate(texts):
        b = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 100
        name = "train" if b < 90 else ("valid" if b < 95 else "test")
        buckets[name].append((did, len(t)))
    for name, rows in buckets.items():
        if not rows:
            assert name not in out.index
            continue
        r = out.loc[name]
        assert r["n_docs"] == len(rows)
        assert r["sum_chars"] == sum(c for _, c in rows)
        assert r["sum_doc"] == sum(d for d, _ in rows)
        assert r["min_doc"] == min(d for d, _ in rows)
        assert r["max_doc"] == max(d for d, _ in rows)
    # a 90/5/5 split of 300 docs should put the bulk in train
    assert out.loc["train", "n_docs"] > 240


def test_group_sample_exact_k_per_stratum(ray_session, tmp_path):
    from index_ray.pipelines.curation import group_sample

    rng = np.random.default_rng(3)
    langs = ["en", "fr", "es"]
    n = 400
    d = tmp_path / "docs"
    d.mkdir()
    lang_col = [langs[i] for i in rng.integers(0, 3, size=n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n),
                "lang": pa.array(lang_col),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array([1] * n, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    k = 7
    out = group_sample(str(d), k=k).to_pandas()

    # brute force: per lang, bottom-k by md5 priority
    pri = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:16], 16) for i in range(n)
    }
    for lang in langs:
        ids = [i for i in range(n) if lang_col[i] == lang]
        want = sorted(sorted(ids, key=lambda i: (pri[i], i))[:k])
        got = sorted(out[out["lang"] == lang]["doc_id"].tolist())
        assert got == want, lang
    assert len(out) == 3 * k


def test_dup_span_coverage_overlapping_spans(ray_session, tmp_path):
    from index_ray.pipelines.dedup import dup_span_coverage

    # "a b c d e" appears in docs 0 and 1 -> with k=4 both 4-grams
    # ("a b c d", "b c d e") are duplicated; their spans overlap and must
    # cover 5 tokens, not 8
    texts = [
        "a b c d e x y z",
        "q q a b c d e",
        "nothing shared here at all",
    ]
    sf = _write_docs(tmp_path, texts)
    out = (
        dup_span_coverage(sf, k=4, min_df=2).to_pandas().set_index("doc_id")
    )
    assert set(out.index) == {0, 1}
    assert out.loc[0, "n_hot_pos"] == 2  # positions 1 and 2
    assert out.loc[0, "covered_pos"] == 5  # tokens 1..5 union
    assert out.loc[1, "n_hot_pos"] == 2  # positions 3 and 4
    assert out.loc[1, "covered_pos"] == 5


def test_dup_span_coverage_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.dedup import dup_span_coverage

    texts = _rand_texts(40, 21)
    sf = _write_docs(tmp_path, texts)
    k, min_df = 3, 2
    out = (
        dup_span_coverage(sf, k=k, min_df=min_df).to_pandas().set_index("doc_id")
    )

    tok = lambda s: [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
    docs = [tok(t) for t in texts]
    gram_docs = {}
    for did, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            gram_docs.setdefault(tuple(toks[i : i + k]), set()).add(did)
    expect = {}
    for did, toks in enumerate(docs):
        cover = set()
        nhot = 0
        for i in range(len(toks) - k + 1):
            if len(gram_docs[tuple(toks[i : i + k])]) >= min_df:
                nhot += 1
                cover.update(range(i, i + k))
        if nhot:
            expect[did] = (nhot, len(cover))
    assert set(out.index) == set(expect)
    for did, (nhot, cov) in expect.items():
        assert out.loc[did, "n_hot_pos"] == nhot, did
        assert out.loc[did, "covered_pos"] == cov, did


def test_facet_counts_match_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.flagship import documents_index
    from index_ray.pipelines.query import BM25Searcher

    rng = np.random.default_rng(9)
    words = ["aa", "bb", "cc", "dd", "ee"]
    langs = ["py", "go", "rs"]
    texts, lang_col = [], []
    for i in range(150):
        texts.append(" ".join(rng.choice(words, size=rng.integers(1, 12)).tolist()))
        lang_col.append(langs[int(rng.integers(0, 3))])
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(lang_col),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    idx = documents_index(str(d))
    s = BM25Searcher(idx)
    got = s.facet_counts(["aa bb", "zz"], facet_col="lang")

    counts = {}
    for i, t in enumerate(texts):
        if {"aa", "bb"} & set(t.split()):
            counts[lang_col[i]] = counts.get(lang_col[i], 0) + 1
    t0 = got[0].to_pydict()
    assert dict(zip(t0["facet"], t0["n_docs"])) == counts
    assert got[0]["facet"].to_pylist() == sorted(counts)
    assert got[1].num_rows == 0  # no match -> empty facet table


def test_user_outlier_events_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.events import user_outlier_events

    rng = np.random.default_rng(17)
    n = 500
    users = rng.integers(0, 20, size=n)
    vals = np.round(rng.exponential(20.0, size=n), 2)
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i * 1000 for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(d / "events.parquet"),
    )
    out = user_outlier_events(str(d)).to_pandas().sort_values("event_id")

    cents = np.round(vals * 100).astype(np.int64)
    want = []
    for i in range(n):
        m = users == users[i]
        if cents[i] * m.sum() > 2 * cents[m].sum():
            want.append(i)
    assert out["event_id"].tolist() == want
    for _, r in out.iterrows():
        m = users == r["user_id"]
        assert r["user_n"] == m.sum()
        assert r["user_sum_cents"] == cents[m].sum()


def test_lm_bigram_score_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.textstats import lm_bigram_score

    texts = [
        "a b a b c",
        "b c a",
        "a",  # single token: no bigrams, omitted
        "",
    ]
    sf = _write_docs(tmp_path, texts)
    out = lm_bigram_score(sf).to_pandas().set_index("doc_id")

    tok = lambda s: [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
    c2, h = {}, {}
    for s in texts:
        t = tok(s)
        for i in range(len(t) - 1):
            bg = (t[i], t[i + 1])
            c2[bg] = c2.get(bg, 0) + 1
            h[t[i]] = h.get(t[i], 0) + 1
    assert set(out.index) == {0, 1}
    for did in [0, 1]:
        t = tok(texts[did])
        bgs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        exp = sum(np.log2(c2[b] / h[b[0]]) for b in bgs)
        assert out.loc[did, "n_bigrams"] == len(bgs)
        assert abs(out.loc[did, "sum_log2p"] - exp) < 1e-9
        assert abs(out.loc[did, "avg_log2p"] - exp / len(bgs)) < 1e-9


# ------------------------------------------------------------- semdedup


def _write_embs(tmp_path, vecs):
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [np.asarray(v, np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_semdedup_matches_bruteforce_and_drops_planted(ray_session, tmp_path):
    from index_ray.pipelines.similarity import _to_matrix, semdedup

    rng = np.random.default_rng(5)
    vecs = list(rng.standard_normal((120, 16)))
    # planted exact duplicates: 3 copies of vec 7, 2 copies of vec 30
    vecs.extend([vecs[7], vecs[7], vecs[30]])
    d = _write_embs(tmp_path, vecs)
    out = (
        semdedup(d, n_centroids=4, threshold=0.9)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(vecs)
    # planted copies (ids 120, 121, 122) must be dropped with the original
    # (same cluster, cosine 1) as witness
    assert out.loc[120, "dropped"] == 1 and out.loc[120, "witness"] == 7
    assert out.loc[121, "dropped"] == 1 and out.loc[121, "witness"] == 7
    assert out.loc[122, "dropped"] == 1 and out.loc[122, "witness"] == 30
    # brute-force re-derivation from the engine's OWN cluster assignment
    m = np.stack([np.asarray(v, np.float64) for v in vecs])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for _, g in out.groupby("cluster"):
        gids = g["vec_id"].to_numpy()
        for row_i, i in enumerate(gids):
            earlier = gids[:row_i]
            want_drop = int(
                bool(len(earlier)) and (m[earlier] @ m[i]).max() >= 0.9
            )
            assert int(g[g["vec_id"] == i]["dropped"].iloc[0]) == want_drop
            if want_drop:
                wit = earlier[np.flatnonzero(m[earlier] @ m[i] >= 0.9)[0]]
                assert int(g[g["vec_id"] == i]["witness"].iloc[0]) == wit


def test_semdedup_consistency_zero_violations(ray_session, tmp_path):
    from index_ray.pipelines.similarity import semdedup_consistency

    rng = np.random.default_rng(9)
    vecs = list(rng.standard_normal((80, 16)))
    vecs.extend([vecs[3], vecs[50]])
    d = _write_embs(tmp_path, vecs)
    t = semdedup_consistency(d, n_centroids=4, threshold=0.9).to_pydict()
    assert t["n_witness_violations"] == [0]
    assert t["n_flag_mismatches"] == [0]


# ---------------------------------------------------------- dup_weights


def test_dup_weights_matches_copy_counts(ray_session, tmp_path):
    from index_ray.pipelines.dedup import dup_weights

    texts = _rand_texts(40, 11)
    # plant: 3 copies of texts[0], 2 copies of texts[5]
    texts = texts + [texts[0], texts[0], texts[5]]
    d = _write_docs(tmp_path, texts)
    out = dup_weights(d).to_pandas().set_index("doc_id").sort_index()
    assert len(out) == len(texts)
    from collections import Counter

    counts = Counter(texts)
    for i, t in enumerate(texts):
        assert out.loc[i, "n_copies"] == counts[t]
        assert out.loc[i, "weight_ppm"] == 1_000_000 // counts[t]


# -------------------------------------------------------- ccnet_buckets


def test_ccnet_buckets_thirds_and_rank(ray_session, tmp_path):
    from index_ray.pipelines.textstats import ccnet_buckets

    texts = _rand_texts(60, 13)
    d = tmp_path / "docs"
    d.mkdir()
    langs = ["en" if i % 3 else "fr" for i in range(len(texts))]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = ccnet_buckets(str(d)).to_pandas()
    # token-less docs omitted; everyone else bucketed
    tokenized = [i for i, t in enumerate(texts) if re.findall(r"[a-z0-9]+", t.lower())]
    assert sorted(out["doc_id"]) == tokenized
    for lang, g in out.groupby("lang"):
        g = g.sort_values("rank")
        n = len(g)
        # rank is dense 1..n and ordered by (q_milli desc, doc_id asc)
        assert list(g["rank"]) == list(range(1, n + 1))
        key = list(zip(-g["q_milli"], g["doc_id"]))
        assert key == sorted(key)
        r0 = g["rank"].to_numpy() - 1
        want = np.where(3 * r0 < n, "head", np.where(3 * r0 < 2 * n, "middle", "tail"))
        assert list(g["bucket"]) == list(want)
    # every lang's thirds are balanced to within one doc
    for _, g in out.groupby("lang"):
        sizes = g["bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1


# ------------------------------------------------------ dsir_importance


def test_dsir_importance_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.textstats import DSIR_BUCKETS, dsir_importance

    texts = _rand_texts(30, 17)
    d = tmp_path / "docs"
    d.mkdir()
    langs = ["en" if i % 2 else "de" for i in range(len(texts))]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = dsir_importance(str(d)).to_pandas().set_index("doc_id")

    nb = DSIR_BUCKETS

    def grams(t):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        return toks + [a + " " + b for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % nb

    c_raw = np.zeros(nb, np.int64)
    c_tgt = np.zeros(nb, np.int64)
    per_doc = {}
    for i, t in enumerate(texts):
        bs = [bucket(g) for g in grams(t)]
        per_doc[i] = bs
        for b in bs:
            c_raw[b] += 1
            if langs[i] == "en":
                c_tgt[b] += 1
    w = np.log2((c_tgt + 1.0) / (c_tgt.sum() + nb)) - np.log2(
        (c_raw + 1.0) / (c_raw.sum() + nb)
    )
    for i, bs in per_doc.items():
        if not bs:
            assert i not in out.index
            continue
        want = float(np.sum(w[bs]))
        assert out.loc[i, "n_grams"] == len(bs)
        assert abs(out.loc[i, "logw_sum"] - want) < 1e-9
        assert abs(out.loc[i, "logw_avg"] - want / len(bs)) < 1e-9
    # target-language docs should score higher on average than off-target
    on = out.loc[[i for i in out.index if langs[i] == "en"], "logw_avg"].mean()
    off = out.loc[[i for i in out.index if langs[i] != "en"], "logw_avg"].mean()
    assert on > off


# ----------------------------------------------------- strip_dup_spans


def test_strip_dup_spans_matches_bruteforce(ray_session, tmp_path):
    from index_ray.pipelines.dedup import strip_dup_spans

    texts = _rand_texts(40, 23)
    # plant a shared 6-token run inside two otherwise-different docs
    shared = "alpha beta gamma delta epsilon zeta"
    texts[3] = "prefix one " + shared + " suffix two"
    texts[9] = "other start " + shared + " other end"
    d = _write_docs(tmp_path, texts)
    k, min_df = 4, 2
    out = strip_dup_spans(d, k=k, min_df=min_df).to_pandas().set_index("doc_id")

    # brute force over the same tokenization
    docs = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in enumerate(texts)}
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for i, toks in docs.items():
        for p in range(len(toks) - k + 1):
            gram_docs[tuple(toks[p:p + k])].add(i)
    for i, toks in docs.items():
        if not toks:
            assert i not in out.index
            continue
        covered = np.zeros(len(toks), bool)
        for p in range(len(toks) - k + 1):
            if len(gram_docs[tuple(toks[p:p + k])]) >= min_df:
                covered[p:p + k] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "n_kept"] == len(kept)
        want = hashlib.sha256(" ".join(kept).encode()).hexdigest() if kept else ""
        assert out.loc[i, "kept_sha256"] == want
    # the planted shared run (and its k-gram margins) was cut from both docs
    assert out.loc[3, "n_kept"] < len(docs[3])
    assert out.loc[9, "n_kept"] < len(docs[9])


# ------------------------------------------------ alt document sources


def test_docs_dataset_reads_jsonl_and_csv(ray_session, tmp_path):
    import json

    from index_ray.pipelines.text import docs_dataset, term_stats

    texts = ["the cat sat", "the dog ran", ""]
    rows = [
        {"doc_id": i, "text": t, "lang": "en", "source": "t", "n_chars": len(t)}
        for i, t in enumerate(texts)
    ]
    jd = tmp_path / "jl"
    jd.mkdir()
    with open(jd / "documents.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cd = tmp_path / "cs"
    cd.mkdir()
    with open(cd / "documents.csv", "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        for r in rows:
            f.write(f"{r['doc_id']},\"{r['text']}\",en,t,{r['n_chars']}\n")
    for d in (str(jd), str(cd)):
        got = docs_dataset(d, ["doc_id", "text"]).to_pandas()
        assert sorted(got.columns) == ["doc_id", "text"]
        assert len(got) == 3
        ts = term_stats(d).to_pandas().set_index("term")
        assert ts.loc["the", "cf"] == 2 and ts.loc["the", "df"] == 2


def test_group_topk_ranked_window(ray_session, tmp_path):
    from index_ray.pipelines.curation import group_topk

    rng = np.random.default_rng(11)
    langs = ["en", "fr", "es"]
    n = 300
    d = tmp_path / "docs"
    d.mkdir()
    lang_col = [langs[i] for i in rng.integers(0, 3, size=n)]
    # repeated n_chars values force the doc_id tiebreak to matter
    chars = [int(c) for c in rng.integers(0, 20, size=n)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n),
                "lang": pa.array(lang_col),
                "source": pa.array(["t"] * n),
                "n_chars": pa.array(chars, pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    k = 5
    out = group_topk(str(d), k=k).to_pandas()
    for lang in langs:
        ids = [i for i in range(n) if lang_col[i] == lang]
        want = sorted(ids, key=lambda i: (-chars[i], i))[:k]
        sub = out[out["lang"] == lang].sort_values("rank")
        assert sub["doc_id"].tolist() == want, lang
        assert sub["rank"].tolist() == list(range(1, len(want) + 1))
        assert sub["n_chars"].tolist() == [chars[i] for i in want]
    assert len(out) == 3 * k


def test_chunk_documents_boundaries(ray_session, tmp_path):
    from index_ray.pipelines.curation import chunk_documents

    d = tmp_path / "docs"
    d.mkdir()
    # token counts planted around the window/stride boundaries for W=8, S=6:
    # 0 toks -> 1 chunk of 0; 8 -> 1 chunk of 8; 9 -> 2 chunks (8, 3);
    # 14 -> 2 chunks (8, 8); 15 -> 3 chunks (8, 8, 3)
    texts = {0: "", 1: "w " * 8, 2: "w " * 9, 3: "w " * 14, 4: "w " * 15}
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)]),
                "lang": pa.array(["en"] * 5),
                "source": pa.array(["t"] * 5),
                "n_chars": pa.array([len(texts[i]) for i in sorted(texts)], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = (
        chunk_documents(str(d), window=8, stride=6)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = {
        0: [(0, 0, 0)],
        1: [(0, 0, 8)],
        2: [(0, 0, 8), (1, 6, 3)],
        3: [(0, 0, 8), (1, 6, 8)],
        4: [(0, 0, 8), (1, 6, 8), (2, 12, 3)],
    }
    for did, chunks in want.items():
        sub = out[out["doc_id"] == did]
        got = list(
            zip(sub["chunk_id"], sub["start_tok"], sub["chunk_tokens"])
        )
        assert got == chunks, did
    # invariant: last chunk reaches the final token of every non-empty doc
    last = out.groupby("doc_id").last()
    n = {0: 0, 1: 8, 2: 9, 3: 14, 4: 15}
    for did, row in last.iterrows():
        assert row["start_tok"] + row["chunk_tokens"] == n[did]


def test_lm_score_top_v_matches_exact_when_v_covers_vocab(ray_session, tmp_path):
    """top_v >= |vocab| must reproduce the exact full-vocab mode bitwise —
    pins the distributed top-V candidate path (local top-V + driver merge
    + distributed total) against the oracle-checked exact path."""
    from index_ray.pipelines.textstats import lm_score

    texts = _rand_texts(60, 8)
    sf = _write_docs(tmp_path, texts)
    exact = lm_score(sf, top_v=None).to_pandas().reset_index(drop=True)
    scaled = lm_score(sf, top_v=100_000).to_pandas().reset_index(drop=True)
    assert scaled.equals(exact)
    # ... and the DEFAULT is the distributed path, equal to exact here
    # because the vocabulary is far below the default cap
    default = lm_score(sf).to_pandas().reset_index(drop=True)
    assert default.equals(exact)


def test_decontaminate_fuzzy_planted(ray_session, tmp_path):
    """A train doc lightly paraphrasing an eval doc (doc_id % 13 == 0)
    must be flagged with the exact integer jaccard; unrelated train docs
    and eval-eval/train-train pairs must not appear."""
    from index_ray.pipelines.curation import DECONTAM_MOD, decontaminate_fuzzy

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        0: base,                                   # eval (0 % 13 == 0)
        1: base + " extra",                        # train near-dup of 0
        2: "totally different words here now yes", # clean train
        13: "another benchmark prompt entirely",   # second eval
        14: base + " padding",                     # train near-dup of 0 too
    }
    ids = sorted(texts)
    import pyarrow.parquet as _pq

    d = tmp_path / "sf"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = decontaminate_fuzzy(str(d), threshold_pct=60).to_pandas()
    pairs = set(zip(out["doc_id"], out["eval_doc"]))
    assert (1, 0) in pairs and (14, 0) in pairs
    assert all(b % DECONTAM_MOD == 0 and a % DECONTAM_MOD != 0 for a, b in pairs)
    assert 2 not in set(out["doc_id"])
    # exact integer jaccard: doc 1 shares all 8 of base's 3-grams;
    # "kappa extra" adds 1 distinct gram -> 8 / 9
    row = out[(out["doc_id"] == 1) & (out["eval_doc"] == 0)].iloc[0]
    assert row["jaccard_pct"] == (100 * 8) // 9


def test_lm_bigram_top_b_matches_exact_when_b_covers_table(ray_session, tmp_path):
    """The distributed default (top-B merge + broadcast-context h totals)
    must reproduce the exact full-table mode bitwise whenever the bigram
    table fits under the cap — pins the scale path to the oracle anchor."""
    from index_ray.pipelines.textstats import lm_bigram_score

    texts = _rand_texts(50, 10)
    sf = _write_docs(tmp_path, texts)
    exact = lm_bigram_score(sf, top_b=None).to_pandas().reset_index(drop=True)
    default = lm_bigram_score(sf).to_pandas().reset_index(drop=True)
    assert default.equals(exact)
    # a tight cap floors the tail but keeps the head's TRUE conditional
    # probabilities (h(w1) summed over the full corpus, not the kept set)
    capped = lm_bigram_score(sf, top_b=3).to_pandas()
    assert len(capped) == len(exact)
