#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with headline + per-query secs.

Headline metric: full inverted-index build (tokenize + stem + shuffle +
pack + docmap + manifests) over a deterministic synthetic source-code
corpus (BENCH_DOCS docs, cached under /tmp after first generation), i.e.
the BASELINE.json "index-build throughput (docs/sec)" criterion.

Env:
  GRAFT_SF_DIR    driver tables dir    (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS  ray.init num_cpus    (default 32)
  BENCH_DOCS      synthetic corpus     (default 400000)
  BENCH_FAST      "1" -> skip the sf-table pipelines (scaling runs)

`python bench.py --scaling` runs the headline job twice in fresh
processes (num_cpus=8 then 32) on the same cached corpus and reports both
throughputs plus efficiency = (t8/t32)/4 — the in-sandbox stand-in for
the N vs 4N cluster-size criterion (results recorded in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# Glibc tunables inherited by Ray workers (set before ray.init): retain
# allocator arenas instead of mmap/munmap churn.  This sandbox provisions
# fresh guest pages at only ~30-80 MB/s (first touch) while recycled pages
# run at >4 GB/s, so every worker must fault its working set once and keep
# it (see BENCH/BASELINE.md "environment note").
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "400000"))
FAST = os.environ.get("BENCH_FAST", "0") == "1"


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # a roomy store stops Ray Data's memory budgeter from throttling the
        # pack stage to ~3 concurrent tasks (measured: 26s -> 17s at 8 cpus)
        object_store_memory=16 << 30,
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from index_ray.pipelines.build import BuildConfig, build_index
    from index_ray.pipelines.query import BM25Searcher
    from index_ray.sources.corpus import write_corpus_ray

    timings: dict[str, float] = {}

    corpus_dir = f"/tmp/bench_corpus_{BENCH_DOCS}"
    t0 = time.time()
    write_corpus_ray(corpus_dir, BENCH_DOCS, seed=42, n_files=64)
    timings["corpus_gen_cached"] = round(time.time() - t0, 3)

    # warm the page cache so both scaling runs measure compute + shuffle
    for f in sorted(os.listdir(corpus_dir)):
        if f.endswith(".parquet"):
            with open(os.path.join(corpus_dir, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    index_dir = f"/tmp/bench_index_{BENCH_DOCS}_{NCPU}"
    cfg = BuildConfig(
        # many chunks: the streaming chunk pipeline overlaps chunk k's
        # (memory-bound) shuffle+pack with chunk k+1's (compute-bound)
        # tokenize — measured: 2-cpu warm build 146s single-chunk vs 85s
        # with 50k-doc chunks (pack_drain 37s -> 5s); a single chunk
        # serializes the two phases and leaves the pack tail unhidden
        chunk_docs=int(os.environ.get("BENCH_CHUNK_DOCS", "50000")),
        # fine partitions: pack working set per task stays ~100MB so the
        # sandbox's fresh-page fault wall (~30-80 MB/s) never dominates
        num_parts=max(64, BENCH_DOCS // 5000),
        batch_size=256,
        salt_docs=16384,
    )
    # cold build: includes worker spawn + this sandbox's ~30-80 MB/s
    # first-touch page provisioning; warm build: the steady state a
    # long-running ingest sustains (worker arenas + object store reused).
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    build_index(corpus_dir, index_dir, cfg)
    timings["index_build_cold"] = round(time.time() - t0, 3)
    # two warm builds, min-of-2: actor pools persist across builds in the
    # session (build.py _session_pools), so these measure the steady state a
    # long-running ingest sustains; min-of-2 rides out host-speed drift
    warms = []
    for _ in range(2):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        build_index(corpus_dir, index_dir, cfg)
        warms.append(time.time() - t0)
    build_sec = min(warms)
    timings["index_build"] = round(build_sec, 3)
    timings["index_build_warms"] = [round(w, 3) for w in warms]
    timings["index_build_docs_per_sec"] = round(BENCH_DOCS / build_sec, 1)

    if not FAST:  # scaling runs time the build only
        t0 = time.time()
        searcher = BM25Searcher(index_dir)
        timings["searcher_load"] = round(time.time() - t0, 3)
        queries = [
            "parse http request", "binary search tree insert", "def return value",
            "nonexistentterm xyzzy", "tokenizer normalization unicode", "connection",
        ]
        t0 = time.time()
        searcher.search_many([(q, 10) for q in queries])
        timings["bm25_6_queries"] = round(time.time() - t0, 3)

        # sustained query throughput: 256 deterministic 2-3 term queries,
        # batched through the shard actors (min-of-2: the second batch is
        # the resident steady state).  Two mixes: a realistic sample of
        # the WHOLE vocabulary (mostly mid/low-df terms — the headline),
        # and the adversarial all-hot mix (every term from the highest-df
        # list, i.e. maximal posting mass per query — the tail latency).
        import glob as _glob
        import random as _random

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        lex_files = sorted(_glob.glob(os.path.join(index_dir, "lexicon", "*.parquet")))
        vocab = _pa.concat_tables(
            _pq.read_table(f, columns=["term"]) for f in lex_files
        )["term"].to_pylist()
        hot = list(searcher.stats.get("hot_terms", [])) or vocab[:64]
        for label, pool in [("bm25_qps", vocab), ("bm25_qps_hot", hot)]:
            rng = _random.Random(42)
            qps_queries = [
                " ".join(rng.sample(pool, k=rng.choice([2, 3])))
                for _ in range(256)
            ]
            runs = []
            for _ in range(2):
                t0 = time.time()
                searcher.search_many([(q, 10) for q in qps_queries])
                runs.append(time.time() - t0)
            timings[label] = round(256 / min(runs), 1)

    if not FAST:
        from index_ray.pipelines import (
            bpe, curation, dedup, events, flagship, graph, sketches, similarity,
            text, textstats,
        )

        def _lk():
            from index_ray.pipelines import linkage

            return linkage

        # min-of-2 per query: the first run pays the session's worker-spawn
        # page faults (wildly host-window-dependent, see environment note);
        # the second is the steady state a resident service serves.
        for name, fn in [
            ("docs_index_and_bm25", lambda: flagship.flagship(SF_DIR)),
            ("term_stats", lambda: text.term_stats(SF_DIR).materialize()),
            ("minhash_dedup", lambda: dedup.minhash_dedup(SF_DIR)),
            ("knn_cosine", lambda: similarity.knn_cosine(SF_DIR)),
            ("windowed_events", lambda: text.windowed_events(SF_DIR).materialize()),
            ("heavy_hitter_terms", lambda: sketches.heavy_hitter_terms(SF_DIR)),
            ("curate_corpus", lambda: curation.curate_corpus(SF_DIR)),
            ("bpe_train", lambda: bpe.bpe_train(SF_DIR, n_merges=24)),
            ("line_dedup", lambda: dedup.line_dedup(SF_DIR).materialize()),
            ("dup_span_coverage", lambda: dedup.dup_span_coverage(SF_DIR).materialize()),
            ("strip_dup_spans", lambda: dedup.strip_dup_spans(SF_DIR).materialize()),
            ("dsir_importance", lambda: textstats.dsir_importance(SF_DIR).materialize()),
            ("ccnet_buckets", lambda: textstats.ccnet_buckets(SF_DIR).materialize()),
            ("semdedup", lambda: similarity.semdedup(SF_DIR).materialize()),
            ("hybrid_search", lambda: flagship.hybrid_search(SF_DIR)),
            ("quality_deciles", lambda: curation.quality_deciles(SF_DIR).materialize()),
            ("pagerank", lambda: graph.pagerank(SF_DIR).materialize()),
            ("connected_components", lambda: graph.connected_components(SF_DIR).materialize()),
            ("hopping_windows", lambda: events.hopping_windows(SF_DIR).materialize()),
            ("skipgram_counts", lambda: text.skipgram_counts(SF_DIR).materialize()),
            ("lm_dirichlet_topk", lambda: flagship.lm_dirichlet_topk(SF_DIR)),
            ("dsl_search", lambda: flagship.dsl_search(SF_DIR)),
            ("mmr_rerank", lambda: flagship.mmr_rerank(SF_DIR)),
            ("significant_terms", lambda: flagship.significant_terms(SF_DIR)),
            ("percolate_queries", lambda: flagship.percolate_queries(SF_DIR).materialize()),
            ("bfs_hops", lambda: graph.bfs_hops(SF_DIR).materialize()),
            ("json_props_stats", lambda: events.json_props_stats(SF_DIR).materialize()),
            ("bm25f_topk", lambda: flagship.bm25f_topk(SF_DIR)),
            ("nrt_search", lambda: flagship.nrt_search(SF_DIR)),
            ("adamic_adar", lambda: graph.adamic_adar(SF_DIR)),
            ("k_core", lambda: graph.k_core(SF_DIR)),
            ("personalized_pagerank",
             lambda: graph.personalized_pagerank(SF_DIR).materialize()),
            ("ewma_user_value", lambda: events.ewma_user_value(SF_DIR).materialize()),
            ("snapshot_diff", lambda: flagship.snapshot_diff(SF_DIR)),
            ("phrase_suggest", lambda: flagship.phrase_suggest(SF_DIR)),
            ("function_score_bm25", lambda: flagship.function_score_bm25(SF_DIR)),
            # round-4 additions: the reshaped per-block top-k combiner,
            # the 2-bit style-enum build+rank path, and the dis_max /
            # wildcard query surfaces (both reuse already-built indexes)
            ("top_terms", lambda: text.top_terms(SF_DIR)),
            ("bm25_style_enum", lambda: flagship.bm25_style_enum(SF_DIR)),
            ("dismax_search", lambda: flagship.dismax_search(SF_DIR)),
            ("wildcard_search", lambda: flagship.wildcard_search(SF_DIR)),
        ] + [
            # round-5 additions: the fully-distributed similarity joins
            # (blocked tile verify; the set join's output is genuinely
            # quadratic — 3.1M pairs at sf0.1)
            ("cosine_similarity_join", lambda: _lk().cosine_similarity_join(SF_DIR)),
            ("set_similarity_join", lambda: _lk().set_similarity_join(SF_DIR)),
        ]:
            runs = []
            for _ in range(2):
                t0 = time.time()
                fn()
                runs.append(time.time() - t0)
            timings[name] = round(min(runs), 3)

    ray.shutdown()
    return {
        "metric": "index_build_seconds",
        "value": timings["index_build"],
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "bench_docs": BENCH_DOCS,
        "num_cpus": NCPU,
    }


def run_stages() -> None:
    """Per-stage breakdown of ONE warm headline build at NCPU cpus
    (VERDICT r04 ask #8): in-actor busy seconds attribute the overlapped
    tokenize stream vs bucket-shuffle pack, plus the driver-side phases
    (pack drain tail, lexicon merge, reverse-lexicon sidecar).  Prints one
    JSON line; results recorded in BENCH/BASELINE.md."""
    import ray

    ray.init(
        address="local", num_cpus=NCPU, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
        object_store_memory=16 << 30,
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from index_ray.pipelines.build import (
        BuildConfig, build_index, session_pool_busy,
    )
    from index_ray.sources.corpus import write_corpus_ray

    corpus_dir = f"/tmp/bench_corpus_{BENCH_DOCS}"
    write_corpus_ray(corpus_dir, BENCH_DOCS, seed=42, n_files=64)
    index_dir = f"/tmp/bench_index_{BENCH_DOCS}_{NCPU}"
    cfg = BuildConfig(
        chunk_docs=int(os.environ.get("BENCH_CHUNK_DOCS", "50000")),
        num_parts=max(64, BENCH_DOCS // 5000),
        batch_size=256,
        salt_docs=16384,
    )
    # warm-up build (cold worker spawn + first-touch faults), then the
    # measured build with per-actor busy counters reset
    shutil.rmtree(index_dir, ignore_errors=True)
    build_index(corpus_dir, index_dir, cfg)
    session_pool_busy(reset=True)
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    r = build_index(corpus_dir, index_dir, cfg)
    total = time.time() - t0
    busy = session_pool_busy()
    # the pack-drain tail (wall after the last tokenize spec) is recorded
    # in one chunk manifest by the dispatch loop
    import glob as _glob

    drains = [r.phase_seconds["pack_drain"]] if "pack_drain" in r.phase_seconds else []
    for mf in _glob.glob(os.path.join(index_dir, "chunks", "*", "MANIFEST.json")):
        with open(mf) as fh:
            d = json.load(fh).get("phase_seconds", {}).get("pack_drain")
        if d is not None:
            drains.append(d)
    out = {
        "metric": "stage_breakdown",
        "unit": "sec",
        "num_cpus": NCPU,
        "bench_docs": BENCH_DOCS,
        "total_wall": round(total, 3),
        # in-actor attribution (sums over all workers; divide by NCPU for
        # the per-core utilization of each stage)
        "tokenize_busy": busy["tokenize_busy"],
        "pack_busy": busy["pack_busy"],
        "tokenize_busy_per_cpu": round(busy["tokenize_busy"] / NCPU, 3),
        "pack_busy_per_cpu": round(busy["pack_busy"] / NCPU, 3),
        # driver-side phases (wall-clock)
        "phases": r.phase_seconds,
        "pack_drain_tail": drains[0] if drains else None,
    }
    ray.shutdown()
    print(json.dumps(out))


def run_scaling() -> None:
    def sub(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_FAST="1",
            BENCH_DOCS=str(BENCH_DOCS),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N. Default 2 vs 8: this sandbox's memory subsystem saturates at
    # ~8 concurrent memory-heavy workers (pure-CPU scales to ~23 cores), so
    # 8-vs-32 measures the host's memory wall, not the engine; see
    # BENCH/BASELINE.md.
    lo = int(os.environ.get("BENCH_SCALING_LO", "2"))
    hi = int(os.environ.get("BENCH_SCALING_HI", "8"))
    rounds = int(os.environ.get("BENCH_SCALING_ROUNDS", "3"))
    lo_secs, hi_secs = [], []
    for _ in range(rounds):  # interleaved: host speed drifts over minutes
        lo_secs.append(sub(lo)["value"])
        hi_secs.append(sub(hi)["value"])
    t_lo, t_hi = min(lo_secs), min(hi_secs)
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "bench_docs": BENCH_DOCS,
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "sec_lo_all": lo_secs,
                "sec_hi_all": hi_secs,
                "docs_per_sec_lo": round(BENCH_DOCS / t_lo, 1),
                "docs_per_sec_hi": round(BENCH_DOCS / t_hi, 1),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--stages" in sys.argv:
        run_stages()
    else:
        print(json.dumps(run_bench()))
