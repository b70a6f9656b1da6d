"""Data-quality audit ops: planted nulls/orphans + oracle parity on testdata."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from index_ray.pipelines.audit import fk_check, profile_documents

SF = "/root/testdata/sf0.001"


def test_profile_documents_planted_nulls(ray_session, tmp_path):
    d = tmp_path / "p"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["a", "b", "c", "d"], pa.string()),
                "lang": pa.array(["en", None, "en", "zz"], pa.string()),
                "source": pa.array(["s", "s", None, None], pa.string()),
                "n_chars": pa.array([5, 9, 5, 1], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = profile_documents(str(d)).to_pandas().set_index("column")
    assert out.loc["lang", "n_rows"] == 4 and out.loc["lang", "n_nulls"] == 1
    assert out.loc["lang", "n_distinct"] == 2
    assert out.loc["lang", "min_val"] == "en" and out.loc["lang", "max_val"] == "zz"
    assert out.loc["source", "n_nulls"] == 2 and out.loc["source", "n_distinct"] == 1
    assert out.loc["n_chars", "n_distinct"] == 3
    assert out.loc["n_chars", "min_val"] == "1" and out.loc["n_chars", "max_val"] == "9"


def test_fk_check_planted_orphans(ray_session, tmp_path):
    d = tmp_path / "fk"
    d.mkdir()
    # minimal 6-table schema with one broken edge (orders -> customer)
    pq.write_table(pa.table({"r_regionkey": pa.array([0], pa.int64())}), str(d / "region.parquet"))
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0, 1], pa.int64()),
                  "n_regionkey": pa.array([0, 0], pa.int64())}),
        str(d / "nation.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([10, 11], pa.int64()),
                  "c_nationkey": pa.array([0, 1], pa.int64())}),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"s_suppkey": pa.array([5], pa.int64()),
                  "s_nationkey": pa.array([1], pa.int64())}),
        str(d / "supplier.parquet"),
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([100, 101, 102], pa.int64()),
                  "o_custkey": pa.array([10, 99, 98], pa.int64())}),  # 2 orphans
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([100, 100, 777], pa.int64())}),  # 1 orphan
        str(d / "lineitem.parquet"),
    )
    out = fk_check(str(d)).to_pandas().set_index("edge")["n_orphans"].to_dict()
    assert out == {
        "lineitem->orders": 1,
        "orders->customer": 2,
        "customer->nation": 0,
        "supplier->nation": 0,
        "nation->region": 0,
    }


def test_audit_matches_duckdb(ray_session):
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders", "lineitem", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name in ("profile_documents", "fk_check"):
        got = E.queries()[name](SF)
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
        want = con.sql(E.oracle_sql()[name]).df()
        cols = sorted(got.columns)
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_fk_check_null_fk_counts_as_orphan(ray_session, tmp_path):
    d = tmp_path / "fknull"
    d.mkdir()
    pq.write_table(pa.table({"r_regionkey": pa.array([0], pa.int64())}), str(d / "region.parquet"))
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0], pa.int64()),
                  "n_regionkey": pa.array([0], pa.int64())}),
        str(d / "nation.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([10], pa.int64()),
                  "c_nationkey": pa.array([0], pa.int64())}),
        str(d / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"s_suppkey": pa.array([5], pa.int64()),
                  "s_nationkey": pa.array([0], pa.int64())}),
        str(d / "supplier.parquet"),
    )
    pq.write_table(
        pa.table({"o_orderkey": pa.array([100, 101], pa.int64()),
                  "o_custkey": pa.array([10, None], pa.int64())}),  # NULL FK
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([100], pa.int64())}),
        str(d / "lineitem.parquet"),
    )
    out = fk_check(str(d)).to_pandas().set_index("edge")["n_orphans"].to_dict()
    assert out["orders->customer"] == 1  # the NULL-key row


def test_profile_documents_all_null_numeric(ray_session, tmp_path):
    d = tmp_path / "pnull"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a", "b"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["s", "s"], pa.string()),
                "n_chars": pa.array([None, None], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = profile_documents(str(d)).to_pandas().set_index("column")
    assert out.loc["n_chars", "n_nulls"] == 2
    assert out.loc["n_chars", "n_distinct"] == 0
    assert out.loc["n_chars", "min_val"] is None
    assert out.loc["n_chars", "max_val"] is None


def test_ingest_corpus_csv_and_format_inference(ray_session, tmp_path):
    """CSV ingests to parquet with values intact; unknown extensions raise."""
    import pandas as pd
    import pytest as _pytest

    from index_ray.sources.ingest import ingest_corpus

    src = tmp_path / "rows.csv"
    pd.DataFrame(
        {"doc_id": [3, 1, 2], "text": ["a b", "c", "d e f"], "n": [10, 20, 30]}
    ).to_csv(src, index=False)
    out = ingest_corpus(str(src), str(tmp_path / "pq"))
    import pyarrow.dataset as pads

    got = (
        pads.dataset(out)
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got["text"].tolist() == ["c", "d e f", "a b"]
    assert got["n"].tolist() == [20, 30, 10]
    with _pytest.raises(ValueError, match="infer ingest format"):
        ingest_corpus(str(tmp_path / "rows.xyz"), str(tmp_path / "pq2"))


def test_ingest_corpus_orc_roundtrip(ray_session, tmp_path):
    """ORC files ingest to parquet with schema and values intact."""
    import pyarrow as pa
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    from index_ray.sources.ingest import ingest_corpus

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b", "c", "d e f"], pa.string()),
            "score": pa.array([1.5, -2.0, 0.25], pa.float64()),
        }
    )
    src = tmp_path / "orc"
    src.mkdir()
    orc.write_table(t.slice(0, 2), str(src / "a.orc"))
    orc.write_table(t.slice(2), str(src / "b.orc"))
    out = ingest_corpus(str(src / "a.orc"), str(tmp_path / "pq_one"), fmt="orc")
    got1 = pq.read_table(out)
    assert got1.num_rows == 2
    out2 = ingest_corpus(
        [str(src / "a.orc"), str(src / "b.orc")], str(tmp_path / "pq_all"), fmt="orc"
    )
    got = pq.read_table(out2).sort_by("doc_id")
    assert got.equals(t.select(got.column_names).cast(got.schema))
