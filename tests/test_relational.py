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
    "rollup_revenue",
    "pivot_revenue",
    "small_quantity_revenue",
    "top_supplier_by_period",
    "revenue_ma3",
    "regression_by_flag",
    "skyline_orders",
    "bloom_semi_join",
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


def test_skyline_ties_and_dominance(ray_session, tmp_path):
    """Planted frontier: both-dim ties all survive; single-dim ties are
    dominated; interior points never appear."""
    import numpy as np
    import pyarrow.parquet as pq

    from index_ray.pipelines.relational import skyline_orders

    d = tmp_path / "sky"
    d.mkdir()
    # (key, price, date): 1&2 tie on both dims (both kept); 3 same date as
    # 1 but cheaper (dominated); 4 later date, lower price (kept);
    # 5 dominated by 4; 6 highest price, earliest date (kept)
    ts = pd.to_datetime(
        ["2024-01-05", "2024-01-05", "2024-01-05",
         "2024-01-09", "2024-01-09", "2024-01-01"]
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "o_totalprice": pa.array(
                    [50.0, 50.0, 49.0, 20.0, 19.0, 80.0], pa.float64()
                ),
                "o_orderdate": pa.array(ts, pa.timestamp("us")),
            }
        ),
        str(d / "orders.parquet"),
    )
    got = skyline_orders(str(d))
    assert got["o_orderkey"].to_pylist() == [1, 2, 4, 6]


def test_bloom_semi_join_empty_and_prune(ray_session, tmp_path):
    """A segment with no customers yields zero rows (the Bloom filter is
    all-zero and prunes every probe row); a planted match passes both the
    Bloom and the exact confirm."""
    import pyarrow.parquet as pq

    from index_ray.pipelines.relational import bloom_semi_join

    d = tmp_path / "bloomj"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_mktsegment": pa.array(["A", "B", "A"], pa.string()),
            }
        ),
        str(d / "customer.parquet"),
    )
    ts = pd.to_datetime(["2024-01-01"] * 4)
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 2, 3, 9], pa.int64()),
                "o_orderpriority": pa.array(["P1", "P1", "P2", "P1"], pa.string()),
                "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
            }
        ),
        str(d / "orders.parquet"),
    )
    got = bloom_semi_join(str(d), segment="A").to_pandas()
    got = got.sort_values("o_orderpriority").reset_index(drop=True)
    assert got["o_orderpriority"].tolist() == ["P1", "P2"]
    assert got["n_orders"].tolist() == [1, 1]
    assert got["total_cents"].tolist() == [1000, 3000]
    empty = bloom_semi_join(str(d), segment="ZZZ").to_pandas()
    assert len(empty) == 0


def test_pivot_revenue_guards_out_of_range_years(ray_session, tmp_path):
    """An order year outside the pivot range must contribute NOTHING (the
    oracle's CASE semantics) — unguarded it would negative-index another
    year's column (1992) or raise (2005)."""
    import duckdb as _duckdb
    import numpy as np
    import pyarrow.parquet as _pq

    from index_ray.pipelines.relational import pivot_revenue, PIVOT_YEARS

    d = tmp_path / "sf"
    d.mkdir()
    _pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
                "n_regionkey": pa.array([0, 0], pa.int64()),
            }
        ),
        str(d / "nation.parquet"),
    )
    _pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
                "c_mktsegment": pa.array(["BUILDING", "MACHINERY"]),
            }
        ),
        str(d / "customer.parquet"),
    )
    import datetime

    _pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [
                        datetime.date(1992, 6, 1),   # below range
                        datetime.date(1996, 6, 1),   # in range
                        datetime.date(2005, 6, 1),   # above range
                        datetime.date(1999, 6, 1),   # in range
                    ]
                ),
                "o_totalprice": pa.array([111.0, 222.0, 333.0, 444.0]),
            }
        ),
        str(d / "orders.parquet"),
    )
    out = pivot_revenue(str(d)).to_pandas().set_index("n_name")
    # out-of-range rows must not leak into any column
    assert out.loc["ALPHA", "y1996"] == 22200
    assert out.loc["BETA", "y1999"] == 44400
    for y in PIVOT_YEARS:
        if y != 1996:
            assert out.loc["ALPHA", f"y{y}"] == 0
        if y != 1999:
            assert out.loc["BETA", f"y{y}"] == 0
