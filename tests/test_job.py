"""The ``python -m index_ray.job`` entrypoint and per-stage metrics.json.

Covers the operational contract BASELINE.json's north rule names: the job
runs via ``ray job submit`` (here: ``main()`` in-process under the session
Ray, which is what the submitted driver script executes) and emits
per-stage throughput metrics, persisted next to the index.
"""

import json
import os

from index_ray.job import main


def test_build_writes_stage_metrics(tiny_corpus_dir, tmp_path, capsys):
    out = str(tmp_path / "idx")
    m = main(
        [
            "build",
            "--source", tiny_corpus_dir,
            "--out", out,
            "--chunk-docs", "100",
        ]
    )
    # one JSON line on stdout, identical to the returned dict
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == json.loads(json.dumps(m, default=str))

    # persisted metrics file with per-stage seconds + throughput
    path = os.path.join(out, "metrics.json")
    assert os.path.exists(path)
    disk = json.load(open(path))
    assert disk == m
    assert m["kind"] == "build"
    assert m["docs_built"] == 200 and m["n_docs_total"] == 200
    assert m["docs_per_sec"] > 0 and m["tokens_per_sec"] > 0
    assert m["output_bytes_total"] > 0
    for stage in ("census", "chunks_total", "lexicon_merge"):
        assert stage in m["stages"], m["stages"]
        assert m["stages"][stage]["seconds"] >= 0

    # idempotent re-run: resumed chunks are excluded from the throughput
    # base — docs_built reports 0, not a fake speedup
    m2 = main(["build", "--source", tiny_corpus_dir, "--out", out,
               "--chunk-docs", "100"])
    assert m2["docs_built"] == 0 and m2["chunks_skipped"] == 2
    assert m2["n_docs_total"] == 200

    # query through the same CLI returns scored rows
    r = main(["query", "--index", out, "--q", "return buffer", "--k", "3"])
    assert 0 < len(r["rows"]) <= 3
    assert {"docID", "score"} <= set(r["rows"][0])

    # fsck through the CLI is clean
    f = main(["fsck", "--index", out])
    assert f["n_issues"] == 0


def test_append_writes_metrics(tiny_corpus_dir, tmp_path):
    from index_ray.sources.corpus import write_corpus

    out = str(tmp_path / "idx")
    main(["build", "--source", tiny_corpus_dir, "--out", out,
          "--chunk-docs", "100"])
    extra = str(tmp_path / "more")
    write_corpus(extra, 60, seed=7, n_files=1)
    m = main(["append", "--source", extra, "--out", out,
              "--chunk-docs", "100"])
    assert m["kind"] == "append"
    assert m["docs_built"] == 60
    assert m["n_docs_total"] == 260


def test_lifecycle_subcommands(tiny_corpus_dir, tmp_path):
    """stats / delete / compact / merge drive the full maintenance surface."""
    a = str(tmp_path / "a")
    main(["build", "--source", tiny_corpus_dir, "--out", a, "--chunk-docs", "100"])

    s = main(["stats", "--index", a])
    assert s["N"] > 0 and s["n_chunks"] >= 1 and s["n_tombstoned"] == 0

    d = main(["delete", "--index", a, "--ids", "0,1"])
    assert d["n_tombstoned"] == 2

    c = main(["compact", "--index", a])
    assert c["n_chunks"] == 1 and c["N"] == s["N"] - 2

    # merge: second index over a disjoint docID range (id_col is None ->
    # sequential from 0, which collides with a's ids) must be loud
    b = str(tmp_path / "b")
    main(["build", "--source", tiny_corpus_dir, "--out", b, "--chunk-docs", "100"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collision"):
        main(["merge", "--dst", a, "--src", b])


def test_upsert_cli(tiny_corpus_dir, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from index_ray.sources.corpus import generate_corpus

    out = str(tmp_path / "idx")
    main(["build", "--source", tiny_corpus_dir, "--out", out,
          "--chunk-docs", "100"])
    full = generate_corpus(200, 42)
    sl = full.slice(0, 3)
    recrawl = pa.table(
        {
            "repo": sl["repo"],
            "path": sl["path"],
            "commit": sl["commit"],
            "lang": sl["lang"],
            "content": pa.array(
                [c + " qqrecrawled" for c in sl["content"].to_pylist()]
            ),
        }
    )
    rdir = tmp_path / "re"
    rdir.mkdir()
    pq.write_table(recrawl, str(rdir / "r0.parquet"))
    m = main(["upsert", "--source", str(rdir), "--out", out,
              "--chunk-docs", "100"])
    assert m["n_replaced"] == 3
    r = main(["query", "--index", out, "--q", "qqrecrawled", "--k", "5"])
    assert len(r["rows"]) == 3
    assert all(row["docID"] >= 200 for row in r["rows"])


def test_snapshot_rollback_and_reverse_lexicon_cli(tiny_corpus_dir, tmp_path):
    """The remaining operational surface: snapshot/rollback round-trips the
    delete, expire-snapshots prunes versions, and reverse-lexicon builds
    the suffix-wildcard sidecar."""
    import os

    idx = str(tmp_path / "ops")
    main(["build", "--source", tiny_corpus_dir, "--out", idx,
          "--chunk-docs", "100"])
    v = main(["snapshot", "--index", idx])["version"]
    before = main(["stats", "--index", idx])

    main(["delete", "--index", idx, "--ids", "0,1,2"])
    assert main(["stats", "--index", idx])["n_tombstoned"] == 3

    r = main(["rollback", "--index", idx, "--version", str(v)])
    assert r["n_tombstoned"] == 0 and r["N"] == before["N"]

    ls = main(["snapshots", "--index", idx])["snapshots"]
    assert any(m["version"] == v for m in ls)
    main(["expire-snapshots", "--index", idx, "--keep-last", "1"])

    n = main(["reverse-lexicon", "--index", idx])["terms"]
    assert n > 0 and os.path.isdir(os.path.join(idx, "lexicon_rev"))


def test_style_levels_cli(tiny_corpus_dir, tmp_path):
    idx = str(tmp_path / "sl")
    main(["build", "--source", tiny_corpus_dir, "--out", idx,
          "--chunk-docs", "100", "--style-levels", "4,16,64"])
    from index_ray.pipelines.build import load_stats

    assert load_stats(idx)["style_levels"] == [4, 16, 64]
    r = main(["query", "--index", idx, "--q", "connection", "--k", "5"])
    assert len(r["rows"]) > 0
