"""Data-quality audit operators: column profiling and referential
integrity — the validation passes a 100 TB ingest runs before anything
else touches the data.

``profile_documents`` computes per-column profiles (rows, nulls, exact
distinct, min/max) as per-batch partials merged through one groupby per
profiled column family — distincts are EXACT here via the partial-
distinct trick (per-batch dedup before the shuffle); a corpus whose
per-column cardinality approaches row count should switch to the HLL
sketch (``sketches.distinct_users_hll``'s register merge) — same shape,
bounded state.

``fk_check`` counts orphan child rows per foreign-key edge of the
TPC-H-ish schema with one bucket shuffle per edge: both sides tagged and
hashed on the key, per-bucket orphans = child keys absent from the
parent side.  Dim-sized parents could broadcast instead; the shuffle
form is the one that holds when the parent is `orders` at 10^11 rows.

Reference parity: the reference engine trusts its crawler's output and
has no audit surface; this is training-data-side extension (every
published pipeline — CCNet, C4, RefinedWeb — fronts ingestion with
exactly these checks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from pandas import isna as pd_isna

from ..util import hash_groupby


def _doc_profile_partial(t: pa.Table) -> pa.Table:
    """batch -> one partial-profile row per (column, distinct value) for
    the categorical columns plus a single numeric-partial row."""
    rows = {"col": [], "val": [], "n_part": [], "null_part": []}
    for col in ("lang", "source"):
        c = t[col]
        nulls = int(c.null_count)
        vc = pa.table({"v": c}).group_by(["v"], use_threads=False).aggregate([([], "count_all")])
        for v, n in zip(vc["v"].to_pylist(), vc[vc.column_names[1]].to_pylist()):
            if v is None:
                continue
            rows["col"].append(col)
            rows["val"].append(v)
            rows["n_part"].append(int(n))
            rows["null_part"].append(0)
        if nulls:
            rows["col"].append(col)
            rows["val"].append("")
            rows["n_part"].append(0)
            rows["null_part"].append(nulls)
    return pa.table(
        {
            "col": pa.array(rows["col"], pa.string()),
            "val": pa.array(rows["val"], pa.string()),
            "n_part": pa.array(rows["n_part"], pa.int64()),
            "null_part": pa.array(rows["null_part"], pa.int64()),
        }
    )


def profile_documents(sf_dir: str) -> pa.Table:
    """Column profile of the documents table: one row per column with
    (n_rows, n_nulls, n_distinct, min_val, max_val) — strings for the
    categorical columns, integers stringified for n_chars, so one schema
    serves every column (the usual profiler layout)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )
    cat = docs.map_batches(_doc_profile_partial, batch_format="pyarrow")

    def cat_final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "column": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "n_nulls": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "min_val": pa.array([], pa.string()),
                    "max_val": pa.array([], pa.string()),
                }
            )
        g = t.group_by(["col", "val"], use_threads=False).aggregate(
            [("n_part", "sum"), ("null_part", "sum")]
        )
        out = {k: [] for k in ("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")}
        import pandas as pd

        df = g.to_pandas()
        for col, grp in df.groupby("col"):
            live = grp[grp["n_part_sum"] > 0]
            out["column"].append(col)
            # count(*) counts null rows too
            out["n_rows"].append(
                int(grp["n_part_sum"].sum() + grp["null_part_sum"].sum())
            )
            out["n_nulls"].append(int(grp["null_part_sum"].sum()))
            out["n_distinct"].append(int(len(live)))
            out["min_val"].append(str(live["val"].min()) if len(live) else None)
            out["max_val"].append(str(live["val"].max()) if len(live) else None)
        return pa.table(
            {
                "column": pa.array(out["column"], pa.string()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_nulls": pa.array(out["n_nulls"], pa.int64()),
                "n_distinct": pa.array(out["n_distinct"], pa.int64()),
                "min_val": pa.array(out["min_val"], pa.string()),
                "max_val": pa.array(out["max_val"], pa.string()),
            }
        )

    cat_rows = hash_groupby(cat, ["col"], cat_final).to_pandas()

    def num_partial(t: pa.Table) -> pa.Table:
        """One combined partial table per batch: a scalar row (is_val=0)
        with counts/min/max plus the batch's deduped values (is_val=1) —
        ONE parquet scan serves both the scalars and the exact distinct."""
        c = t["n_chars"]
        v = pc.drop_null(c).to_numpy(zero_copy_only=False)
        uniq = np.unique(v.astype(np.int64)) if len(v) else np.empty(0, np.int64)
        z = np.zeros(len(uniq), np.int64)
        return pa.table(
            {
                "v": pa.array(
                    np.concatenate([[0], uniq]), pa.int64()
                ),
                "is_val": pa.array(np.r_[np.zeros(1, np.int8), np.ones(len(uniq), np.int8)]),
                "n_part": pa.array(np.concatenate([[len(c)], z]), pa.int64()),
                "null_part": pa.array(
                    np.concatenate([[int(c.null_count)], z]), pa.int64()
                ),
                "min_part": pa.array(
                    [int(uniq.min()) if len(uniq) else None] + [None] * len(uniq),
                    pa.int64(),
                ),
                "max_part": pa.array(
                    [int(uniq.max()) if len(uniq) else None] + [None] * len(uniq),
                    pa.int64(),
                ),
            }
        )

    parts = docs.map_batches(num_partial, batch_format="pyarrow").materialize()
    scal = parts.map_batches(
        lambda t: t.filter(pc.equal(t["is_val"], 0)), batch_format="pyarrow"
    ).to_pandas()
    dis = (
        parts.map_batches(
            lambda t: t.filter(pc.equal(t["is_val"], 1)).select(["v"]),
            batch_format="pyarrow",
        )
        .groupby("v")
        .count()
        .count()
    )
    mn, mx = scal["min_part"].min(), scal["max_part"].max()
    num_row = pa.table(
        {
            "column": pa.array(["n_chars"], pa.string()),
            "n_rows": pa.array([int(scal["n_part"].sum())], pa.int64()),
            "n_nulls": pa.array([int(scal["null_part"].sum())], pa.int64()),
            "n_distinct": pa.array([int(dis)], pa.int64()),
            # all-NULL column: NULL min/max, matching the SQL aggregates
            "min_val": pa.array(
                [None if pd_isna(mn) else str(int(mn))], pa.string()
            ),
            "max_val": pa.array(
                [None if pd_isna(mx) else str(int(mx))], pa.string()
            ),
        }
    )
    return pa.concat_tables([pa.Table.from_pandas(cat_rows, preserve_index=False), num_row])


def profile_documents_sql_oracle() -> str:
    parts = []
    for col in ("lang", "source"):
        parts.append(f"""
        SELECT '{col}' AS column,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER ({col} IS NULL) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(min({col}) AS VARCHAR) AS min_val,
               CAST(max({col}) AS VARCHAR) AS max_val
        FROM documents""")
    parts.append("""
        SELECT 'n_chars' AS column,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (n_chars IS NULL) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT n_chars) AS BIGINT) AS n_distinct,
               CAST(min(n_chars) AS VARCHAR) AS min_val,
               CAST(max(n_chars) AS VARCHAR) AS max_val
        FROM documents""")
    return " UNION ALL ".join(parts)


FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_check(sf_dir: str) -> pa.Table:
    """Referential-integrity audit: per FK edge, how many child rows point
    at a missing parent key.  One bucket shuffle per edge over (key, side,
    n) partials — per-batch pre-aggregation means only distinct keys cross
    the wire; per-bucket orphan counting is a sorted-set membership test.
    All-zero on intact TPC-H data; the planted pytest breaks an edge."""
    rows = {"edge": [], "n_orphans": []}
    for edge, child, ck, parent, pk in FK_EDGES:
        cds = ray.data.read_parquet(f"{sf_dir}/{child}.parquet", columns=[ck])
        pds = ray.data.read_parquet(f"{sf_dir}/{parent}.parquet", columns=[pk])

        def c_part(t: pa.Table, _k=ck) -> pa.Table:
            col = t[_k]
            # a NULL foreign key never matches any parent — it is an orphan
            # by the oracle's LEFT JOIN semantics; count them under side=2
            # (summed unconditionally in the reduce, bucket placement moot)
            nn = int(col.null_count)
            raw = pc.drop_null(col).to_numpy(zero_copy_only=False)
            v, n = np.unique(raw.astype(np.int64), return_counts=True)
            side = np.zeros(len(v), np.int8)
            if nn:
                v = np.concatenate([v, [0]])
                side = np.concatenate([side, [np.int8(2)]])
                n = np.concatenate([n, [nn]])
            return pa.table(
                {
                    "key": pa.array(v, pa.int64()),
                    "side": pa.array(side),
                    "n": pa.array(n.astype(np.int64)),
                }
            )

        def p_part(t: pa.Table, _k=pk) -> pa.Table:
            raw = pc.drop_null(t[_k]).to_numpy(zero_copy_only=False)
            v = np.unique(raw.astype(np.int64))
            return pa.table(
                {
                    "key": pa.array(v, pa.int64()),
                    "side": pa.array(np.ones(len(v), np.int8)),
                    "n": pa.array(np.zeros(len(v), np.int64)),
                }
            )

        both = cds.map_batches(c_part, batch_format="pyarrow").union(
            pds.map_batches(p_part, batch_format="pyarrow")
        )

        def orphans(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"n_orphans": pa.array([0], pa.int64())})
            key = t["key"].to_numpy(zero_copy_only=False)
            side = t["side"].to_numpy(zero_copy_only=False)
            n = t["n"].to_numpy(zero_copy_only=False)
            parents = np.unique(key[side == 1])
            child_mask = side == 0
            miss = ~np.isin(key[child_mask], parents)
            total = int(n[child_mask][miss].sum()) + int(n[side == 2].sum())
            return pa.table({"n_orphans": pa.array([total], pa.int64())})

        total = int(
            hash_groupby(both, ["key"], orphans).to_pandas()["n_orphans"].sum()
        )
        rows["edge"].append(edge)
        rows["n_orphans"].append(total)
    return pa.table(
        {
            "edge": pa.array(rows["edge"], pa.string()),
            "n_orphans": pa.array(rows["n_orphans"], pa.int64()),
        }
    )


def fk_check_sql_oracle() -> str:
    parts = []
    for edge, child, ck, parent, pk in FK_EDGES:
        parts.append(f"""
        SELECT '{edge}' AS edge,
               CAST(count(*) FILTER (p.{pk} IS NULL) AS BIGINT) AS n_orphans
        FROM {child} c LEFT JOIN {parent} p ON c.{ck} = p.{pk}""")
    return " UNION ALL ".join(parts)


def jsonl_ingest(sf_dir: str) -> ray.data.Dataset:
    """Ingestion round trip: dump ``documents`` to newline-delimited JSON,
    convert it back to parquet through :func:`sources.ingest.ingest_corpus`
    (the raw-dump -> engine-layout path a crawl ingest runs), and
    aggregate the ROUND-TRIPPED table per language.  The oracle computes
    the identical aggregate over the ORIGINAL parquet — row counts,
    int64 values and string contents must all survive the two format
    conversions bit-exactly for the hashes to match.
    """
    import hashlib
    import os

    from ..sources.ingest import ingest_corpus
    from .text import docs_dataset

    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    base = f"/tmp/index_ray_ingest_{key}"
    marker = os.path.join(base, ".done")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        jl = os.path.join(base, "jsonl")
        os.makedirs(jl)
        docs_dataset(sf_dir).write_json(jl)
        ingest_corpus(jl, os.path.join(base, "parquet"), fmt="jsonl")
        with open(marker, "w") as f:
            f.write("done")

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "doc_id": t["doc_id"],
                "text_len": pc.utf8_length(t["text"]).cast(pa.int64()),
            }
        ).group_by(["lang"], use_threads=False).aggregate(
            [("n_chars", "count"), ("n_chars", "sum"),
             ("doc_id", "sum"), ("text_len", "sum")]
        )
        return g.rename_columns(["lang", "n_p", "chars_p", "ids_p", "len_p"])

    from ray.data.aggregate import Sum

    return (
        ray.data.read_parquet(os.path.join(base, "parquet"))
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("lang")
        .aggregate(
            Sum("n_p", alias_name="n_docs"),
            Sum("chars_p", alias_name="chars_sum"),
            Sum("ids_p", alias_name="id_sum"),
            Sum("len_p", alias_name="text_len_sum"),
        )
    )


def jsonl_ingest_sql_oracle() -> str:
    return """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_sum,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               CAST(sum(length(text)) AS BIGINT) AS text_len_sum
        FROM documents GROUP BY lang
    """


def orc_ingest(sf_dir: str) -> ray.data.Dataset:
    """ORC ingestion round trip (the columnar twin of ``jsonl_ingest``):
    dump ``documents`` to ORC shards (one per input block, written inside
    the task), convert back to parquet through
    ``sources.ingest.ingest_corpus(fmt="orc")``, and aggregate the
    round-tripped table per language — identical oracle contract to the
    JSONL path, so types and contents must survive both conversions
    bit-exactly.
    """
    import hashlib
    import os

    from ..sources.ingest import ingest_corpus
    from .text import docs_dataset

    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    base = f"/tmp/index_ray_orcingest_{key}"
    marker = os.path.join(base, ".done")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        oc = os.path.join(base, "orc")
        os.makedirs(oc)

        def dump(t: pa.Table) -> pa.Table:
            # side-write one ORC shard per block; deterministic name from
            # the block's id range -> idempotent under task retry
            import pyarrow.orc as _orc

            if t.num_rows:
                lo = int(pc.min(t["doc_id"]).as_py())
                _orc.write_table(t, os.path.join(oc, f"part-{lo:012d}.orc"))
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        docs_dataset(sf_dir).map_batches(
            dump, batch_format="pyarrow"
        ).materialize()
        ingest_corpus(oc, os.path.join(base, "parquet"), fmt="orc")
        with open(marker, "w") as f:
            f.write("done")

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "doc_id": t["doc_id"],
                "text_len": pc.utf8_length(t["text"]).cast(pa.int64()),
            }
        ).group_by(["lang"], use_threads=False).aggregate(
            [("n_chars", "count"), ("n_chars", "sum"),
             ("doc_id", "sum"), ("text_len", "sum")]
        )
        return g.rename_columns(["lang", "n_p", "chars_p", "ids_p", "len_p"])

    from ray.data.aggregate import Sum

    return (
        ray.data.read_parquet(os.path.join(base, "parquet"))
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("lang")
        .aggregate(
            Sum("n_p", alias_name="n_docs"),
            Sum("chars_p", alias_name="chars_sum"),
            Sum("ids_p", alias_name="id_sum"),
            Sum("len_p", alias_name="text_len_sum"),
        )
    )


def orc_ingest_sql_oracle() -> str:
    return jsonl_ingest_sql_oracle()
