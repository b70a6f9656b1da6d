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


def _revenue_fine(sf_dir: str):
    """Finest-level (l_returnflag, l_linestatus) revenue aggregate as a
    pandas frame — ONE distributed scan (integer-cents partials, same
    exactness contract as ``pricing_summary``); every coarser ROLLUP /
    CUBE level is an exact re-aggregation of this |flags|x|statuses|-row
    result, so the derivation cost is independent of fact-table size."""

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "rev_cents": _cents(rev),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"], use_threads=False).aggregate(
            [("rev_cents", "count"), ("rev_cents", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "n_part", "rev_part"]
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("rev_part", alias_name="revenue_cents"),
        )
        .to_pandas()
    )


_REV_SCHEMA = pa.schema(
    [
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("n", pa.int64()),
        ("revenue_cents", pa.int64()),
    ]
)


def _rev_table(out) -> pa.Table:
    out = out[["l_returnflag", "l_linestatus", "n", "revenue_cents"]].copy()
    out["n"] = out["n"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False).cast(_REV_SCHEMA)


def rollup_revenue(sf_dir: str) -> pa.Table:
    """OLAP ROLLUP over (l_returnflag, l_linestatus): finest-level rows
    plus per-returnflag subtotals plus a grand total, exactly DuckDB's
    ``GROUP BY ROLLUP`` (NULL marks a rolled-up dimension).  One
    distributed scan (``_revenue_fine``); coarser levels derive on the
    driver from that tiny result."""
    fine = _revenue_fine(sf_dir)
    mid = (
        fine.groupby("l_returnflag", as_index=False)[["n", "revenue_cents"]]
        .sum()
        .assign(l_linestatus=None)
    )
    top = fine[["n", "revenue_cents"]].sum().to_frame().T
    top["l_returnflag"] = None
    top["l_linestatus"] = None
    import pandas as pd

    out = pd.concat([fine, mid, top], ignore_index=True)
    return _rev_table(out)


def cube_revenue(sf_dir: str) -> pa.Table:
    """OLAP CUBE over (l_returnflag, l_linestatus): all four grouping
    sets — finest, per-flag, per-status, grand total — exactly DuckDB's
    ``GROUP BY CUBE``.  Same shape as :func:`rollup_revenue` plus the
    per-status marginal: one distributed finest-level scan
    (``_revenue_fine``), every marginal an exact driver-side
    re-aggregation of that tiny table."""
    import pandas as pd

    fine = _revenue_fine(sf_dir)
    by_flag = (
        fine.groupby("l_returnflag", as_index=False)[["n", "revenue_cents"]]
        .sum()
        .assign(l_linestatus=None)
    )
    by_status = (
        fine.groupby("l_linestatus", as_index=False)[["n", "revenue_cents"]]
        .sum()
        .assign(l_returnflag=None)
    )
    top = fine[["n", "revenue_cents"]].sum().to_frame().T
    top["l_returnflag"] = None
    top["l_linestatus"] = None
    out = pd.concat([fine, by_flag, by_status, top], ignore_index=True)
    return _rev_table(out)


def cube_revenue_sql_oracle() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """


def rollup_revenue_sql_oracle() -> str:
    return """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """


def regression_by_flag(sf_dir: str) -> ray.data.Dataset:
    """Per-``l_returnflag`` simple linear regression of revenue (cents)
    on quantity — distributed statistical moments.

    Each batch emits exact-integer partial moments (n, Sx, Sy, Sxx,
    Sxy); one tiny groupby folds them; slope/intercept are then pure
    float64 arithmetic over the folded int64 moments, so the oracle
    (computing the same ints, then the same expression) matches
    bitwise.  This is the canonical one-pass distributed-regression
    shape: moments commute, raw rows never shuffle.
    """

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = _cents(
            pc.multiply(
                batch["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), batch["l_discount"]),
            )
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "n_p": pa.array(np.ones(len(x), np.int64)),
                "sx_p": pa.array(x),
                "sy_p": pa.array(y),
                "sxx_p": pa.array(x * x),
                "sxy_p": pa.array(x * y),
            }
        )
        g = t.group_by(["l_returnflag"], use_threads=False).aggregate(
            [("n_p", "sum"), ("sx_p", "sum"), ("sy_p", "sum"),
             ("sxx_p", "sum"), ("sxy_p", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "n_p", "sx_p", "sy_p", "sxx_p", "sxy_p"]
        )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return t.append_column("slope", pa.array(slope, pa.float64())).append_column(
            "intercept", pa.array(intercept, pa.float64())
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("sx_p", alias_name="sx"),
            Sum("sy_p", alias_name="sy"),
            Sum("sxx_p", alias_name="sxx"),
            Sum("sxy_p", alias_name="sxy"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def regression_by_flag_sql_oracle() -> str:
    # the engine computes slope/intercept in float64 FROM the exact
    # integer moments; the oracle mirrors that expression exactly
    return """
        WITH m AS (
          SELECT l_returnflag,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
                 CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) AS BIGINT) AS sy,
                 CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                      AS BIGINT) AS sxx,
                 CAST(sum(CAST(l_quantity AS BIGINT) *
                          CAST(round(l_extendedprice * (1 - l_discount) * 100)
                               AS BIGINT)) AS BIGINT) AS sxy
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n, sx, sy, sxx, sxy,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
               (CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        FROM m
    """


def skyline_orders(sf_dir: str) -> pa.Table:
    """Pareto frontier (skyline) of orders: maximize BOTH
    ``o_totalprice`` and ``o_orderdate`` — no other order is >= on both
    dimensions and > on at least one.

    Distributed shape: each batch reduces to its LOCAL skyline (the
    skyline operator's key property — local skylines are tiny,
    O(frontier) not O(rows) — and the global skyline is a subset of the
    union of local ones), then one final single-partition pass merges.
    Raw rows never shuffle; only frontier candidates do.
    """

    def local_skyline(batch: pa.Table) -> pa.Table:
        price = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        date = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = _skyline_mask(price, date)
        return pa.table(
            {
                "o_orderkey": pa.array(key[keep], pa.int64()),
                "price_cents": pa.array(price[keep], pa.int64()),
                "date_us": pa.array(date[keep], pa.int64()),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        keep = _skyline_mask(
            batch["price_cents"].to_numpy(zero_copy_only=False),
            batch["date_us"].to_numpy(zero_copy_only=False),
        )
        return batch.filter(pa.array(keep))

    t = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(local_skyline, batch_format="pyarrow", batch_size=16384)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    out = pa.Table.from_pylist(
        t,
        schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("price_cents", pa.int64()),
                ("date_us", pa.int64()),
            ]
        ),
    )
    return out.sort_by("o_orderkey")


def _skyline_mask(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for the 2-D max/max skyline: sort by (date desc,
    price desc); a row survives iff its price strictly exceeds every
    LATER-dated row's price (running max over the sorted prefix), with
    exact ties on both dims surviving together (neither dominates)."""
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-price, -date))
    p_s, d_s = price[order], date[order]
    # running max of price over rows with STRICTLY LATER date: group rows
    # by date; the max over all previous date-groups is the dominator bar
    new_date = np.empty(n, dtype=bool)
    new_date[0] = True
    np.not_equal(d_s[1:], d_s[:-1], out=new_date[1:])
    grp = np.cumsum(new_date) - 1
    ngrp = int(grp[-1]) + 1
    grp_max = np.full(ngrp, np.iinfo(np.int64).min, dtype=np.int64)
    np.maximum.at(grp_max, grp, p_s)
    prev_max = np.empty(ngrp, dtype=np.int64)
    prev_max[0] = np.iinfo(np.int64).min
    if ngrp > 1:
        np.maximum.accumulate(grp_max[:-1], out=prev_max[1:])
    # survive iff strictly above every later-dated price AND at the max
    # of the own-date group (both-dim ties all survive together)
    keep_sorted = (p_s > prev_max[grp]) & (p_s == grp_max[grp])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_orders_sql_oracle() -> str:
    return """
        WITH o AS (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                 CAST(epoch_us(o_orderdate) AS BIGINT) AS date_us
          FROM orders
        )
        SELECT a.o_orderkey, a.price_cents, a.date_us
        FROM o a
        WHERE NOT EXISTS (
          SELECT 1 FROM o b
          WHERE b.price_cents >= a.price_cents AND b.date_us >= a.date_us
            AND (b.price_cents > a.price_cents OR b.date_us > a.date_us)
        )
        ORDER BY a.o_orderkey
    """


_BLOOM_BITS = 1 << 17  # 16 KiB of filter; ~0.1% fp at 2k keys / 4 hashes
_BLOOM_K = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(len(keys), _BLOOM_K) bit positions via double hashing of a
    splitmix64-style mix — arrays stay on the LEFT of every operator
    (numpy scalar-on-left is pathologically slow on this host)."""
    x = keys.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    h1 = x & np.uint64(_BLOOM_BITS - 1)
    h2 = (x >> np.uint64(17)) | np.uint64(1)  # odd stride
    ks = np.arange(_BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + h2[:, None] * ks[None, :]) % np.uint64(_BLOOM_BITS)


def bloom_semi_join(sf_dir: str, segment: str = "BUILDING") -> ray.data.Dataset:
    """Orders semi-joined to customers of one market segment through a
    BROADCAST BLOOM FILTER, then aggregated per order priority.

    The scale pattern this demonstrates: when the probe side is the
    100 TB fact table, shipping every row into a key-partitioned shuffle
    join is the dominant cost — a Bloom filter built from the (already
    filtered) build side and broadcast once via ``ray.put`` prunes
    non-matching probe rows AT THE SCAN, so only survivors (matches + a
    ~0.1% false-positive tail) pay any further join cost.  The exact
    confirm here is a broadcast sorted-key membership test (the build
    side is one segment of the customer dimension); were the build side
    itself huge, the confirm becomes a shuffle join over the pruned
    survivors — the Bloom stage is unchanged.

    Output: (o_orderpriority, n_orders, total_cents) over orders whose
    customer is in ``segment`` — exact, hash-compared to the semi-join
    SQL.
    """

    def build_partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["c_mktsegment"], segment)
        keys = batch.filter(keep)["c_custkey"].to_numpy(zero_copy_only=False)
        bits = np.zeros(_BLOOM_BITS, dtype=bool)
        if len(keys):
            bits[_bloom_positions(keys).ravel()] = True
        # one fixed-size bitmap row per batch; OR-fold on the driver
        return pa.table(
            {
                "bits": pa.array([np.packbits(bits)]),
                "keys": pa.array([keys.astype(np.int64)]),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        .map_batches(build_partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()
    )
    packed = np.bitwise_or.reduce(np.stack(parts["bits"].to_numpy()), axis=0)
    bloom = np.unpackbits(packed).astype(bool)
    exact_keys = np.sort(np.concatenate(list(parts["keys"].to_numpy())))
    bloom_ref = ray.put(bloom)
    keys_ref = ray.put(exact_keys)

    def probe(batch: pa.Table) -> pa.Table:
        blm = ray.get(bloom_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(ck)
        maybe = blm[pos].all(axis=1)  # Bloom prune: scan-side, no shuffle
        surv = batch.filter(pa.array(maybe))
        sk = surv["o_custkey"].to_numpy(zero_copy_only=False)
        # exact confirm over survivors only (fp tail removed)
        hit = np.zeros(len(sk), dtype=bool)
        if len(sk):
            ek = ray.get(keys_ref)
            idx = np.searchsorted(ek, sk)
            idx[idx >= len(ek)] = len(ek) - 1 if len(ek) else 0
            hit = (ek[idx] == sk) if len(ek) else hit
        surv = surv.filter(pa.array(hit))
        t = pa.table(
            {
                "o_orderpriority": surv["o_orderpriority"],
                "cents": _cents(surv["o_totalprice"]),
            }
        )
        g = t.group_by(["o_orderpriority"], use_threads=False).aggregate(
            [("cents", "count"), ("cents", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "n_part", "cents_part"])

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority", "o_totalprice"],
        )
        .map_batches(probe, batch_format="pyarrow", batch_size=16384)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_part", alias_name="n_orders"),
            Sum("cents_part", alias_name="total_cents"),
        )
    )


def bloom_semi_join_sql_oracle(segment: str = "BUILDING") -> str:
    return f"""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = '{segment}'
        )
        GROUP BY o_orderpriority
    """


PIVOT_YEARS = list(range(1995, 2002))


def pivot_revenue(sf_dir: str) -> pa.Table:
    """PIVOT: the nation x order-year revenue matrix — one row per nation,
    one integer column per order year (y1995..y2001), values = total
    o_totalprice in cents for that nation's customers in that year.

    The wide step is a single (nation, year)-keyed partial aggregation —
    at most 25 x 7 rows per batch cross the shuffle, never raw orders; the
    pivot itself reshapes the tiny (nation, year) aggregate on the driver.
    customer->nationkey is the broadcast small side (``ray.put`` once; at
    10^12 rows it becomes a hash-partitioned join, the pivot is unchanged).
    """
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
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
        nat = cn_sorted[np.searchsorted(ck_sorted, ck)]
        yr = pc.year(batch["o_orderdate"]).to_numpy(zero_copy_only=False)
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        # one combined (nation, year) key per row; bincount both measures
        key = nat.astype(np.int64) * 10_000 + yr
        uniq, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "n_name": pa.array(
                    [names[int(u // 10_000)] for u in uniq], pa.string()
                ),
                "year": pa.array((uniq % 10_000).astype(np.int64)),
                "cents_part": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["n_name", "year"])
        .aggregate(Sum("cents_part", alias_name="cents"))
    )
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    names = pc.unique(t["n_name"]).to_pylist()
    names.sort()
    row_of = {n: i for i, n in enumerate(names)}
    mat = np.zeros((len(names), len(PIVOT_YEARS)), dtype=np.int64)
    nn = t["n_name"].to_pylist()
    yy = t["year"].to_numpy(zero_copy_only=False)
    cc = t["cents"].to_numpy(zero_copy_only=False)
    for n, y, c in zip(nn, yy, cc):
        # guard to the pivot range (mirrors the oracle's CASE): an
        # out-of-range year must contribute nothing — unguarded, a year
        # below the range would negative-index another year's column and
        # one above would raise
        if PIVOT_YEARS[0] <= int(y) <= PIVOT_YEARS[-1]:
            mat[row_of[n], int(y) - PIVOT_YEARS[0]] = c
    cols: dict[str, pa.Array] = {"n_name": pa.array(names, pa.string())}
    for j, y in enumerate(PIVOT_YEARS):
        cols[f"y{y}"] = pa.array(mat[:, j])
    return pa.table(cols)


def pivot_revenue_sql_oracle() -> str:
    year_cols = ",\n               ".join(
        f"CAST(coalesce(sum(CASE WHEN y = {y} THEN cents END), 0) AS BIGINT) AS y{y}"
        for y in PIVOT_YEARS
    )
    return f"""
        SELECT n_name,
               {year_cols}
        FROM (
          SELECT c_nationkey, year(o_orderdate) AS y,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey
        ) j JOIN nation ON n_nationkey = j.c_nationkey
        GROUP BY n_name
    """


def small_quantity_revenue(sf_dir: str, frac_pct: int = 70) -> pa.Table:
    """TPC-H Q17 flavor (correlated aggregate subquery): total revenue of
    lineitems whose quantity is below ``frac_pct``% of their part's
    average quantity — (n_items, revenue_cents), one row.

    Two passes, no self-join shuffle: pass 1 pre-aggregates (partkey,
    sum_qty_cents, n) per batch and folds the per-part averages small;
    pass 2 re-streams lineitem with the threshold map BROADCAST
    (``ray.put`` once) and filter+sums in place.  Exactness: the
    threshold compare is integer cents cross-multiplied —
    ``100 * qty_cents * den < frac_pct * sum_qty_cents`` — no float
    division on either side.  At 10^12 rows pass 1's fold becomes one
    more groupby and the broadcast a bucketed join; the two-pass shape
    is unchanged.
    """

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p": batch["l_partkey"],
                "q": _cents(batch["l_quantity"]),
            }
        )
        g = t.group_by(["p"], use_threads=False).aggregate(
            [("q", "sum"), ("q", "count")]
        )
        return g.rename_columns(["p", "q_sum", "n"])

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
        )
        .map_batches(qty_partial, batch_format="pyarrow", batch_size=16384)
        .groupby("p")
        .aggregate(Sum("q_sum", alias_name="q_sum"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    pk = parts["p"].to_numpy()
    order = np.argsort(pk)
    thr_ref = ray.put(
        (
            pk[order],
            parts["q_sum"].to_numpy()[order],
            parts["n"].to_numpy()[order],
        )
    )

    def pass2(batch: pa.Table) -> pa.Table:
        pks, qsum, nn = ray.get(thr_ref)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = _cents(batch["l_quantity"]).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pks, p)
        # integer cross-multiplication: q < (frac/100) * (q_sum / n)
        keep = 100 * q * nn[pos] < frac_pct * qsum[pos]
        rev = _cents(
            pc.multiply(
                batch["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), batch["l_discount"]),
            )
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_part": pa.array([int(keep.sum())], pa.int64()),
                "rev_part": pa.array([int(rev[keep].sum())], pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(pass2, batch_format="pyarrow", batch_size=16384)
        .to_pandas()
    )
    return pa.table(
        {
            "n_items": pa.array([int(agg["n_part"].sum())], pa.int64()),
            "revenue_cents": pa.array([int(agg["rev_part"].sum())], pa.int64()),
        }
    )


def small_quantity_revenue_sql_oracle(frac_pct: int = 70) -> str:
    return f"""
        WITH q AS (
          SELECT l_partkey,
                 CAST(round(l_quantity * 100) AS BIGINT) AS qc,
                 CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   AS rc
          FROM lineitem
        ),
        avgq AS (
          SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS q_sum,
                 CAST(count(*) AS BIGINT) AS n
          FROM q GROUP BY l_partkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(coalesce(sum(q.rc), 0) AS BIGINT) AS revenue_cents
        FROM q JOIN avgq USING (l_partkey)
        WHERE 100 * q.qc * avgq.n < {frac_pct} * avgq.q_sum
    """


Q15_FROM = "1996-01-01"
Q15_TO = "1996-04-01"  # [from, to): the TPC-H Q15 three-month window


def top_supplier_by_period(sf_dir: str) -> pa.Table:
    """TPC-H Q15 flavor (aggregate -> global argmax -> dimension join):
    the supplier(s) with the maximum lineitem revenue shipped in
    [Q15_FROM, Q15_TO) — (s_suppkey, s_name, revenue_cents), ALL ties.

    One date-pruned scan with per-batch (suppkey, cents) partials, one
    small groupby, the argmax on the driver over per-supplier rows, and
    the supplier dimension probed by key (predicate pushdown) — the
    revenue table never leaves the cluster unaggregated.
    """
    import pyarrow.dataset as pads

    lo = np.datetime64(Q15_FROM)
    hi = np.datetime64(Q15_TO)

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        b = batch.filter(pa.array(keep))
        rev = _cents(
            pc.multiply(
                b["l_extendedprice"],
                pc.subtract(pa.scalar(1.0), b["l_discount"]),
            )
        )
        t = pa.table({"s": b["l_suppkey"], "c": rev})
        g = t.group_by(["s"], use_threads=False).aggregate([("c", "sum")])
        return g.rename_columns(["s", "c_part"])

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("s")
        .aggregate(Sum("c_part", alias_name="revenue_cents"))
        .to_pandas()
    )
    best = agg["revenue_cents"].max()
    top = agg[agg["revenue_cents"] == best].sort_values("s")
    keys = [int(x) for x in top["s"]]
    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(keys),
    )
    names = dict(
        zip(supp["s_suppkey"].to_pylist(), supp["s_name"].to_pylist())
    )
    return pa.table(
        {
            "s_suppkey": pa.array(keys, pa.int64()),
            "s_name": pa.array([names[k] for k in keys], pa.string()),
            "revenue_cents": pa.array(
                [int(x) for x in top["revenue_cents"]], pa.int64()
            ),
        }
    )


def top_supplier_by_period_sql_oracle() -> str:
    return f"""
        WITH rev AS (
          SELECT l_suppkey AS s_suppkey,
                 CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) AS BIGINT) AS revenue_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
            AND l_shipdate <  TIMESTAMP '{Q15_TO}'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, rev.revenue_cents
        FROM rev JOIN supplier s USING (s_suppkey)
        WHERE rev.revenue_cents = (SELECT max(revenue_cents) FROM rev)
    """


def revenue_ma3(sf_dir: str) -> pa.Table:
    """Time-series smoothing over a distributed aggregate: the 3-month
    centered moving average of monthly lineitem revenue — (month, n_items,
    revenue_cents, ma3_cents_x3).

    The heavy work is :func:`revenue_by_month` (streamed partials + one
    groupby); the window runs over the resulting ~dozens-of-rows series
    on the driver, which is the honest shape — a windowed pass over an
    already-aggregated time series is never cluster-sized.  Exactness:
    the moving "average" is kept as the 3-month SUM (``x3``), so the
    output stays integer and hash-exact (boundary months average over
    the available 2 neighbors in SQL; emitting the sum sidesteps the
    2-vs-3 denominator convention entirely).
    """
    t = pa.Table.from_pandas(
        revenue_by_month(sf_dir).to_pandas(), preserve_index=False
    ).sort_by("month")
    rev = t["revenue_cents"].to_numpy(zero_copy_only=False)
    prev = np.concatenate([[0], rev[:-1]])
    nxt = np.concatenate([rev[1:], [0]])
    return pa.table(
        {
            "month": t["month"],
            "n_items": t["n_items"],
            "revenue_cents": t["revenue_cents"],
            "ma3_cents_x3": pa.array(prev + rev + nxt, pa.int64()),
        }
    )


def revenue_ma3_sql_oracle() -> str:
    return """
        WITH m AS (
          SELECT strftime(l_shipdate, '%Y-%m') AS month,
                 CAST(count(*) AS BIGINT) AS n_items,
                 CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)) AS BIGINT) AS revenue_cents
          FROM lineitem GROUP BY 1
        )
        SELECT month, n_items, revenue_cents,
               CAST(sum(revenue_cents) OVER (
                 ORDER BY month ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
               ) AS BIGINT) AS ma3_cents_x3
        FROM m
    """
