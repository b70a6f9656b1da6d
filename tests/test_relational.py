"""Relational pipelines vs DuckDB at sf0.001 (the driver's own comparison,
pinned in pytest so a regression shows up before the round gate)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod
import ray.data

SF = "/root/testdata/sf0.001"

NAMES = [
    "pricing_summary",
    "orders_by_nation",
    "top_customers_by_segment",
    "revenue_by_month",
    "parts_revenue_by_brand",
    "supplier_balance_by_region",
    "value_percentiles",
    "customers_without_big_orders",
    "returned_items_by_nation",
    "top_suppliers",
    "market_share_by_year",
    "orders_with_big_items",
    "top_parts_by_brand",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]


@pytest.mark.parametrize("name", NAMES)
def test_relational_matches_duckdb(ray_session, name):
    res = entrymod.queries()[name](SF)
    if isinstance(res, ray.data.Dataset):
        got = res.to_pandas()
    elif isinstance(res, pa.Table):
        got = res.to_pandas()
    else:
        got = res
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.sql(entrymod.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_percentile_definition_matches_quantile_disc(ray_session, tmp_path):
    # tiny planted histogram where off-by-one index definitions diverge:
    # values [1,2,3,4] -> p50 must be 2 (ceil(0.5*4)=2nd), p90 -> 4, p99 -> 4
    import pyarrow.parquet as pq

    from index_ray.pipelines.events import value_percentiles

    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1], pa.int64()),
            "event_type": pa.array(["x"] * 4, pa.string()),
            "value": pa.array([0.01, 0.02, 0.03, 0.04], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    d = tmp_path / "pev"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = value_percentiles(str(d)).to_pandas()
    r = out.iloc[0]
    assert r["n"] == 4
    assert (r["p50_cents"], r["p90_cents"], r["p99_cents"]) == (2, 4, 4)


def test_customer_order_counts_includes_zero_order_customers(ray_session):
    import duckdb

    res = entrymod.queries()["customer_order_counts"](SF).to_pandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.sql(entrymod.oracle_sql()["customer_order_counts"]).df()
    cols = sorted(res.columns)
    a = res[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    n_cust = con.sql(f"SELECT count(*) FROM '{SF}/customer.parquet'").fetchone()[0]
    assert len(res) == n_cust  # outer join keeps every customer
