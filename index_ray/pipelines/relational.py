"""Relational pipelines over the TPC-H-ish driver tables.

Demonstrates the engine's general data-processing surface (scan ->
map_batches partial aggregation -> small groupby; broadcast-small-side
joins) with exact-integer outputs so every query hash-compares against a
DuckDB oracle:

- money/quantity sums are computed in CENTS via half-away-from-zero
  rounding per row (float sums are order-dependent; integer sums are not);
- ranks use (value desc, key asc) tie-breaks.

Scale notes: the partial-aggregate pattern shuffles one row per key per
batch (never raw rows); the customer->nation join broadcasts the keyed
lookup once via ``ray.put`` (at 10^12 rows the small side becomes a
hash-partitioned join, the aggregation pattern is unchanged).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Exact integer cents with DuckDB round() semantics."""
    return pc.round(
        pc.multiply(col, 100.0), round_mode="half_towards_infinity"
    ).cast(pa.int64())


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 flavor: per (l_returnflag, l_linestatus) totals.

    (l_returnflag, l_linestatus, n, qty_cents, price_cents, revenue_cents)
    — revenue = extendedprice * (1 - discount), rounded to cents per row.
    """

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_cents": _cents(batch["l_quantity"]),
                "price_cents": _cents(batch["l_extendedprice"]),
                "revenue_cents": _cents(rev),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("qty_cents", "count"), ("qty_cents", "sum"),
             ("price_cents", "sum"), ("revenue_cents", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n_part", "qty_part", "price_part", "rev_part"]
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("qty_part", alias_name="qty_cents"),
            Sum("price_part", alias_name="price_cents"),
            Sum("rev_part", alias_name="revenue_cents"),
        )
    )


def orders_by_nation(sf_dir: str) -> ray.data.Dataset:
    """(n_name, n_orders, total_cents) — orders joined to customer nation.

    customer->nation is the broadcast small side (``ray.put`` once, read in
    each task); orders stream through map_batches.
    """
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ckeys = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cnat = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    order_c = np.argsort(ckeys)
    nnames = {
        int(k): v
        for k, v in zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    }
    lookup_ref = ray.put((ckeys[order_c], cnat[order_c], nnames))

    def partial(batch: pa.Table) -> pa.Table:
        ck_sorted, cn_sorted, names = ray.get(lookup_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck_sorted, ck)
        nat = cn_sorted[pos]  # every order has a valid customer
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(nat, return_inverse=True)
        return pa.table(
            {
                "n_name": pa.array([names[int(u)] for u in uniq], pa.string()),
                "orders_part": pa.array(np.bincount(inv).astype(np.int64)),
                "cents_part": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("n_name")
        .aggregate(
            Sum("orders_part", alias_name="n_orders"),
            Sum("cents_part", alias_name="total_cents"),
        )
    )


def top_customers_by_segment(sf_dir: str, k: int = 5) -> pa.Table:
    """Per market segment: top-k customers by account balance.

    (c_mktsegment, rank, c_custkey, acctbal_cents) — per-batch local top-k
    then a driver merge of candidate rows (k * n_segments * n_batches, tiny).
    """

    def local_topk(batch: pa.Table) -> pa.Table:
        seg = batch["c_mktsegment"].to_numpy(zero_copy_only=False)
        key = batch["c_custkey"].to_numpy(zero_copy_only=False)
        bal = _cents(batch["c_acctbal"]).to_numpy(zero_copy_only=False)
        out_idx = []
        for s in np.unique(seg):
            sel = np.flatnonzero(seg == s)
            order = np.lexsort((key[sel], -bal[sel]))[:k]
            out_idx.append(sel[order])
        idx = np.concatenate(out_idx) if out_idx else np.empty(0, np.int64)
        return pa.table(
            {
                "c_mktsegment": pa.array(seg[idx], pa.string()),
                "c_custkey": pa.array(key[idx], pa.int64()),
                "acctbal_cents": pa.array(bal[idx], pa.int64()),
            }
        )

    cand = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_mktsegment", "c_custkey", "c_acctbal"],
        )
        .map_batches(local_topk, batch_format="pyarrow", batch_size=16384)
        .to_pandas()
    )
    # driver merge, vectorized: one lexsort over the candidate rows
    # (segment asc, balance desc, custkey asc), then rank-within-segment
    # from the sorted run starts
    seg = cand["c_mktsegment"].to_numpy()
    key = cand["c_custkey"].to_numpy()
    bal = cand["acctbal_cents"].to_numpy()
    order = np.lexsort((key, -bal, seg))
    seg, key, bal = seg[order], key[order], bal[order]
    starts = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    rank = np.arange(len(seg)) - np.repeat(starts, np.diff(np.r_[starts, len(seg)])) + 1
    keep = rank <= k
    return pa.table(
        {
            "c_mktsegment": pa.array(seg[keep], pa.string()),
            "rank": pa.array(rank[keep], pa.int64()),
            "c_custkey": pa.array(key[keep].astype(np.int64), pa.int64()),
            "acctbal_cents": pa.array(bal[keep].astype(np.int64), pa.int64()),
        }
    )


def revenue_by_segment(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q3 flavor: lineitem revenue rolled up to customer market
    segment — exercises the BUCKETED SHUFFLE JOIN (``join.hash_join``)
    between two large tables (lineitem x orders), with the customer ->
    segment dimension broadcast.

    (c_mktsegment, n_items, revenue_cents); lineitem is pre-aggregated per
    (orderkey) per batch before the shuffle, so the join moves one row per
    order per batch instead of one per lineitem.
    """
    from .join import hash_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    order_c = np.argsort(ck)
    seg_sorted = cust["c_mktsegment"].to_numpy(zero_copy_only=False)[order_c]
    lookup_ref = ray.put((ck[order_c], seg_sorted))

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table(
            {"o_orderkey": batch["l_orderkey"], "rev_cents": _cents(rev)}
        )
        g = t.group_by(["o_orderkey"], use_threads=False).aggregate(
            [("rev_cents", "count"), ("rev_cents", "sum")]
        )
        return g.rename_columns(["o_orderkey", "n_part", "rev_part"])

    def o_segment(batch: pa.Table) -> pa.Table:
        ck_sorted, segs = ray.get(lookup_ref)
        pos = np.searchsorted(ck_sorted, batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "c_mktsegment": pa.array(segs[pos], pa.string()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=16384)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_segment, batch_format="pyarrow", batch_size=16384)
    return (
        hash_join(li, orders, on="o_orderkey", num_buckets=32)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_part", alias_name="n_items"),
            Sum("rev_part", alias_name="revenue_cents"),
        )
    )


def parts_revenue_by_brand(sf_dir: str) -> ray.data.Dataset:
    """(p_brand, n_items, revenue_cents) — lineitem revenue per part brand.

    part is the broadcast side (``ray.put`` of a searchsorted-keyed array
    pair, read once per task); lineitem streams.  At a scale where part no
    longer fits a worker, this becomes ``join.hash_join`` on l_partkey —
    same downstream aggregate.
    """
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    order_p = np.argsort(pk)
    brand_sorted = part["p_brand"].to_numpy(zero_copy_only=False)[order_p]
    lookup_ref = ray.put((pk[order_p], brand_sorted))

    def partial(batch: pa.Table) -> pa.Table:
        pk_sorted, brands = ray.get(lookup_ref)
        pos = np.searchsorted(
            pk_sorted, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table(
            {
                "p_brand": pa.array(brands[pos], pa.string()),
                "rev_cents": _cents(rev),
            }
        )
        g = t.group_by(["p_brand"], use_threads=False).aggregate(
            [("rev_cents", "count"), ("rev_cents", "sum")]
        )
        return g.rename_columns(["p_brand", "n_part", "rev_part"])

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("p_brand")
        .aggregate(
            Sum("n_part", alias_name="n_items"),
            Sum("rev_part", alias_name="revenue_cents"),
        )
    )


def supplier_balance_by_region(sf_dir: str) -> ray.data.Dataset:
    """(r_name, n_suppliers, acctbal_cents) — suppliers rolled up through
    nation -> region (two chained broadcast dimensions, one stream pass)."""
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rnames = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )
    nat2region = {
        int(k): rnames[v]
        for k, v in zip(
            nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()
        )
    }
    lookup_ref = ray.put(nat2region)

    def partial(batch: pa.Table) -> pa.Table:
        n2r = ray.get(lookup_ref)
        nat = batch["s_nationkey"].to_numpy(zero_copy_only=False)
        cents = _cents(batch["s_acctbal"]).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(nat, return_inverse=True)
        t = pa.table(
            {
                "r_name": pa.array([n2r[int(u)] for u in uniq], pa.string()),
                "sup_part": pa.array(np.bincount(inv).astype(np.int64)),
                "cents_part": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            }
        )
        g = t.group_by(["r_name"], use_threads=False).aggregate(
            [("sup_part", "sum"), ("cents_part", "sum")]
        )
        return g.rename_columns(["r_name", "sup_part", "cents_part"])

    return (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("r_name")
        .aggregate(
            Sum("sup_part", alias_name="n_suppliers"),
            Sum("cents_part", alias_name="acctbal_cents"),
        )
    )


def customers_without_big_orders(
    sf_dir: str, threshold: float = 400_000.0
) -> ray.data.Dataset:
    """ANTI-join via the bucketed shuffle: customers with NO order above
    ``threshold``, counted per market segment.

    (c_mktsegment, n_customers).  The right side streams orders, filters,
    and collapses each batch to its distinct custkeys before the shuffle
    (duplicates can't change anti-join semantics, so the partial is free
    row reduction); ``hash_join(..., how="left anti")`` then drops every
    bucket-local match in one vectorized Arrow call.  Same machinery gives
    "left semi" for EXISTS-shaped queries.
    """
    from .join import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def big_keys(batch: pa.Table) -> pa.Table:
        m = pc.greater(batch["o_totalprice"], pa.scalar(threshold))
        u = np.unique(batch["o_custkey"].filter(m).to_numpy(zero_copy_only=False))
        return pa.table({"c_custkey": pa.array(u, pa.int64())})

    big = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(big_keys, batch_format="pyarrow", batch_size=16384)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["c_mktsegment"], use_threads=False).aggregate(
            [("c_custkey", "count")]
        )
        return g.rename_columns(["c_mktsegment", "n_part"])

    return (
        hash_join(cust, big, on="c_custkey", num_buckets=32, how="left anti")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_part", alias_name="n_customers"))
    )


def returned_items_by_nation(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q10 flavor: revenue of RETURNED lineitems rolled up to the
    customer's nation — (n_name, n_items, revenue_cents).

    lineitem filters l_returnflag='R' at the read (row-level predicate,
    nothing else leaves storage), pre-aggregates per orderkey per batch,
    then bucket-shuffle-joins orders; customer->nation is broadcast.
    """
    from .join import hash_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    order_c = np.argsort(ck)
    cnat_sorted = cust["c_nationkey"].to_numpy(zero_copy_only=False)[order_c]
    nnames = {
        int(k): v
        for k, v in zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    }
    lookup_ref = ray.put((ck[order_c], cnat_sorted, nnames))

    def li_partial(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["l_returnflag"], pa.scalar("R"))
        b = batch.filter(m)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table({"o_orderkey": b["l_orderkey"], "rev_cents": _cents(rev)})
        g = t.group_by(["o_orderkey"], use_threads=False).aggregate(
            [("rev_cents", "count"), ("rev_cents", "sum")]
        )
        return g.rename_columns(["o_orderkey", "n_part", "rev_part"])

    def o_nation(batch: pa.Table) -> pa.Table:
        ck_sorted, cnat, names = ray.get(lookup_ref)
        pos = np.searchsorted(
            ck_sorted, batch["o_custkey"].to_numpy(zero_copy_only=False)
        )
        nat = cnat[pos]
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "n_name": pa.array([names[int(x)] for x in nat], pa.string()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=16384)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_nation, batch_format="pyarrow", batch_size=16384)
    return (
        hash_join(li, orders, on="o_orderkey", num_buckets=32)
        .groupby("n_name")
        .aggregate(
            Sum("n_part", alias_name="n_items"),
            Sum("rev_part", alias_name="revenue_cents"),
        )
    )


def top_suppliers(sf_dir: str, k: int = 10) -> pa.Table:
    """TPC-H Q15 flavor: the k suppliers with the highest lineitem revenue.

    (rank, s_suppkey, s_name, revenue_cents) — per-batch partial aggregate
    per suppkey, one small groupby (rows = distinct suppliers), per-batch
    local top-k candidates, driver merge of k x n_batches rows; supplier
    names broadcast.  Ties break (revenue desc, suppkey asc).
    """
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    snames = dict(zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist()))

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table({"s_suppkey": batch["l_suppkey"], "rev_cents": _cents(rev)})
        g = t.group_by(["s_suppkey"], use_threads=False).aggregate(
            [("rev_cents", "sum")]
        )
        return g.rename_columns(["s_suppkey", "rev_part"])

    def local_topk(batch: pa.Table) -> pa.Table:
        key = batch["s_suppkey"].to_numpy(zero_copy_only=False)
        rev = batch["revenue_cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -rev))[:k]
        return batch.take(pa.array(order))

    cand = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("s_suppkey")
        .aggregate(Sum("rev_part", alias_name="revenue_cents"))
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["revenue_cents", "s_suppkey"], ascending=[False, True]
    ).head(k)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(cand) + 1, dtype=np.int64)),
            "s_suppkey": pa.array(cand["s_suppkey"].to_numpy(), pa.int64()),
            "s_name": pa.array(
                [snames[int(x)] for x in cand["s_suppkey"]], pa.string()
            ),
            "revenue_cents": pa.array(cand["revenue_cents"].to_numpy(), pa.int64()),
        }
    )


def market_share_by_year(sf_dir: str, region: str = "ASIA") -> ray.data.Dataset:
    """TPC-H Q8 flavor: per order year, lineitem revenue supplied from
    ``region`` vs total — (o_year, region_cents, total_cents).

    The share is reported as exact integer numerator/denominator (a float
    ratio would be order-dependent).  supplier->nation->region membership
    is broadcast as a sorted-key bool array; lineitem pre-aggregates per
    orderkey per batch; ONE bucket shuffle joins the order year on.
    """
    from .join import hash_join

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rkeys = {
        int(k)
        for k, v in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
        if v == region
    }
    nat_in = {
        int(k): (int(v) in rkeys)
        for k, v in zip(
            nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()
        )
    }
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    order_s = np.argsort(sk)
    s_in = np.array(
        [nat_in[int(x)] for x in sup["s_nationkey"].to_numpy(zero_copy_only=False)],
        dtype=bool,
    )[order_s]
    lookup_ref = ray.put((sk[order_s], s_in))

    def li_partial(batch: pa.Table) -> pa.Table:
        sk_sorted, in_region = ray.get(lookup_ref)
        pos = np.searchsorted(
            sk_sorted, batch["l_suppkey"].to_numpy(zero_copy_only=False)
        )
        inr = in_region[pos]
        rev = _cents(
            pc.multiply(
                batch["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), batch["l_discount"]),
            )
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "reg_cents": pa.array(np.where(inr, rev, 0)),
                "tot_cents": pa.array(rev),
            }
        )
        g = t.group_by(["o_orderkey"], use_threads=False).aggregate(
            [("reg_cents", "sum"), ("tot_cents", "sum")]
        )
        return g.rename_columns(["o_orderkey", "reg_part", "tot_part"])

    def o_year(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_year": pc.strftime(batch["o_orderdate"], format="%Y"),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", batch_size=16384)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_year, batch_format="pyarrow", batch_size=16384)
    return (
        hash_join(li, orders, on="o_orderkey", num_buckets=32)
        .groupby("o_year")
        .aggregate(
            Sum("reg_part", alias_name="region_cents"),
            Sum("tot_part", alias_name="total_cents"),
        )
    )


def orders_with_big_items(sf_dir: str, min_qty: float = 49.0) -> ray.data.Dataset:
    """TPC-H Q4 flavor SEMI-join: orders having at least one lineitem with
    quantity >= ``min_qty``, counted per order priority.

    (o_orderpriority, n_orders).  The right side collapses each lineitem
    batch to its distinct qualifying orderkeys before the shuffle;
    ``hash_join(..., how="left semi")`` keeps each order exactly once no
    matter how many qualifying items it has (per-bucket pyarrow semi-join
    dedups, and orderkeys never repeat across left batches).
    """
    from .join import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )

    def big_keys(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["l_quantity"], pa.scalar(min_qty))
        u = np.unique(batch["l_orderkey"].filter(m).to_numpy(zero_copy_only=False))
        return pa.table({"o_orderkey": pa.array(u, pa.int64())})

    big = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(big_keys, batch_format="pyarrow", batch_size=16384)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_orderpriority"], use_threads=False).aggregate(
            [("o_orderkey", "count")]
        )
        return g.rename_columns(["o_orderpriority", "n_part"])

    return (
        hash_join(orders, big, on="o_orderkey", num_buckets=32, how="left semi")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_part", alias_name="n_orders"))
    )


def revenue_by_month(sf_dir: str) -> ray.data.Dataset:
    """(month, n_items, revenue_cents) — tumbling month windows over
    l_shipdate; month is the ISO 'YYYY-MM' string."""

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.strftime(batch["l_shipdate"], format="%Y-%m")
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table({"month": m, "rev_cents": _cents(rev)})
        g = t.group_by(["month"], use_threads=False).aggregate(
            [("rev_cents", "count"), ("rev_cents", "sum")]
        )
        return g.rename_columns(["month", "n_part", "rev_part"])

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("month")
        .aggregate(
            Sum("n_part", alias_name="n_items"),
            Sum("rev_part", alias_name="revenue_cents"),
        )
    )


def customer_order_counts(sf_dir: str) -> ray.data.Dataset:
    """LEFT OUTER bucket join: every customer with their order count,
    INCLUDING zero-order customers — (c_custkey, n_orders).

    Orders pre-aggregate to one row per custkey per batch before the
    shuffle; the per-bucket pyarrow left-outer join emits null for
    order-less customers, coalesced to 0 in the same task.
    """
    from .join import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def o_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_custkey": batch["o_custkey"]})
        g = t.group_by(["c_custkey"], use_threads=False).aggregate(
            [("c_custkey", "count")]
        )
        return g.rename_columns(["c_custkey", "n_part"])

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(o_partial, batch_format="pyarrow", batch_size=16384)

    joined = hash_join(cust, orders, on="c_custkey", num_buckets=32, how="left outer")

    def merge(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "n_part": pc.coalesce(batch["n_part"], pa.scalar(0, pa.int64())),
            }
        )
        g = t.group_by(["c_custkey"], use_threads=False).aggregate([("n_part", "sum")])
        return g.rename_columns(["c_custkey", "n_part"])

    return (
        joined.map_batches(merge, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n_part", alias_name="n_orders"))
    )


def top_parts_by_brand(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Grouped top-N THROUGH the shuffle (no driver merge): the k parts
    with the highest lineitem revenue per brand.

    (p_brand, rank, p_partkey, revenue_cents).  ONE brand-keyed hash
    shuffle: the per-batch partial collapses lineitem to (brand, part)
    rows, and the per-partition finalize does the final part-revenue sum
    AND the per-brand rank in the same Arrow pass — the scale shape for
    "top N per group" when the group count is too large for the driver
    merge `top_customers_by_segment` uses.
    """
    from ..util import hash_groupby

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    order_p = np.argsort(pk)
    brand_sorted = part["p_brand"].to_numpy(zero_copy_only=False)[order_p]
    lookup_ref = ray.put((pk[order_p], brand_sorted))

    def partial(batch: pa.Table) -> pa.Table:
        pk_sorted, brands = ray.get(lookup_ref)
        pos = np.searchsorted(
            pk_sorted, batch["l_partkey"].to_numpy(zero_copy_only=False)
        )
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table(
            {
                "p_brand": pa.array(brands[pos], pa.string()),
                "p_partkey": batch["l_partkey"],
                "rev_cents": _cents(rev),
            }
        )
        g = t.group_by(["p_brand", "p_partkey"], use_threads=False).aggregate(
            [("rev_cents", "sum")]
        )
        return g.rename_columns(["p_brand", "p_partkey", "rev_part"])

    def topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    "p_partkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        g = t.group_by(["p_brand", "p_partkey"], use_threads=False).aggregate(
            [("rev_part", "sum")]
        )
        brands = g["p_brand"].to_numpy(zero_copy_only=False)
        keys = g["p_partkey"].to_numpy(zero_copy_only=False)
        rev = g["rev_part_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -rev, brands))
        b_s, k_s, r_s = brands[order], keys[order], rev[order]
        new_b = np.empty(len(b_s), dtype=bool)
        new_b[0] = True
        np.not_equal(b_s[1:], b_s[:-1], out=new_b[1:])
        starts = np.flatnonzero(new_b)
        idx = np.arange(len(b_s))
        rank = idx - np.repeat(starts, np.diff(np.append(starts, len(b_s)))) + 1
        keep = rank <= k
        return pa.table(
            {
                "p_brand": pa.array(b_s[keep], pa.string()),
                "rank": pa.array(rank[keep], pa.int64()),
                "p_partkey": pa.array(k_s[keep], pa.int64()),
                "revenue_cents": pa.array(r_s[keep], pa.int64()),
            }
        )

    per_part = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=16384)
    return hash_groupby(per_part, keys=["p_brand"], finalize=topk)
