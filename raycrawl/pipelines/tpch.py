"""TPC-H multi-dimension join shapes over the driver tables.

The reference has no relational operators (SURVEY §2.6); this module
completes the TPC-H query-shape family started in relops.py / analytics.py
with the multi-dimension snowflake joins (Q4/Q5/Q7/Q8/Q9/Q10/Q16/Q20
shapes). Shared plan across all of them:

- ONE big-big hash join at most (orders x lineitem on the orderkey, via
  the native ``Dataset.join``); every dimension (customer, supplier,
  nation, region, part) rides the object store once (``ray.put``) and is
  probed per batch through the per-actor ``_DimIndex`` — dims are the
  small side at any corpus scale, facts never broadcast.
- selective filters are applied BEFORE the join on both sides (year /
  date-window / returnflag / part-type pushdown), so the shuffle moves
  only qualifying rows.
- per-batch partial pre-aggregation after the join: the final groupby
  moves one row per (batch, group), bounded by the group domain.
- all money in exact-integer centi-cents (price_cents * (100 -
  discount_pct)) and ratios in integer 4096ths, so the DuckDB oracles
  hash bit-identically.

The driver schema has no partsupp table and no
l_commitdate/l_receiptdate/l_shipmode columns, so Q4/Q9/Q16/Q20 are
ADAPTED shapes (documented per function): the join/aggregate structure
of the original query over the columns that exist.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from raycrawl.pipelines.dedup import clean_blocks
from raycrawl.pipelines.relops import (
    _cents,
    _DimIndex,
    _read,
    join_parts,
    pool_size,
)

__all__ = [
    "q5_local_supplier_volume",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q4_late_ship_priority",
    "q16_supplier_variety",
    "q20_dominant_suppliers",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q11_important_stock",
]


def _ccents(t: pa.Table) -> pa.Array:
    """Exact-integer discounted revenue: price_cents * (100 - disc_pct)."""
    disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
    return pc.multiply(
        _cents(t["l_extendedprice"]),
        pc.subtract(pa.scalar(100, pa.int64()), disc),
    )


def _dim(sf_dir: str, name: str, columns: list[str]) -> pa.Table:
    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def q5_local_supplier_volume(
    sf_dir: str, region: str = "ASIA", year: int = 1997
) -> rd.Dataset:
    """(n_name, revenue_ccents): revenue from lineitems where the customer
    and the supplier sit in the SAME nation of one region, for one order
    year — the TPC-H Q5 shape (6-table snowflake join).

    Plan: orders batches resolve custkey -> nationkey through the
    broadcast dim and drop non-region/non-year rows BEFORE the join;
    lineitem batches resolve suppkey -> nationkey the same way; ONE
    native hash join on the orderkey; the same-nation equality filter and
    the nation-name partial aggregate run per joined batch, so the final
    groupby is bounded by the nation domain."""
    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _dim(sf_dir, "region", ["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"][0].as_py()
    in_region = pc.cast(pc.equal(nation["n_regionkey"], rkey), pa.int64())
    cust = _dim(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(
        (
            cust["c_custkey"].combine_chunks(),
            cust["c_nationkey"].combine_chunks(),
            supp["s_suppkey"].combine_chunks(),
            supp["s_nationkey"].combine_chunks(),
            nation["n_nationkey"].combine_chunks(),
            nation["n_name"].combine_chunks(),
            in_region.combine_chunks(),
        )
    )

    class OrderSide:
        def __init__(self):
            ck, self.cnat, _, _, nk, _, self.inreg = ray.get(dims_ref)
            self.cidx = _DimIndex(ck)
            self.nidx = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(pc.year(t["o_orderdate"]), year))
            cnat = self.cnat.take(self.cidx.lookup(t["o_custkey"]))
            keep = pc.equal(self.inreg.take(self.nidx.lookup(cnat)), 1)
            return pa.table(
                {"o_orderkey": t["o_orderkey"], "c_nat": cnat}
            ).filter(keep)

    class LineSide:
        def __init__(self):
            _, _, sk, self.snat, nk, _, self.inreg = ray.get(dims_ref)
            self.sidx = _DimIndex(sk)
            self.nidx = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            snat = self.snat.take(self.sidx.lookup(t["l_suppkey"]))
            keep = pc.equal(self.inreg.take(self.nidx.lookup(snat)), 1)
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "s_nat": snat,
                    "ccents": _ccents(t),
                }
            ).filter(keep)

    # filtered sides can leave empty/schema-less blocks the native join
    # chokes on (the documented Ray sharp edge) — clean_blocks both sides;
    # they are already pruned to the qualifying fraction of the facts
    orders = clean_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            OrderSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema([("o_orderkey", pa.int64()), ("c_nat", pa.int64())]),
    )
    lines = clean_blocks(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(
            LineSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema(
            [("l_orderkey", pa.int64()), ("s_nat", pa.int64()),
             ("ccents", pa.int64())]
        ),
    )
    joined = orders.join(
        lines,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    class NamePartial:
        def __init__(self):
            _, _, _, _, nk, self.names, _ = ray.get(dims_ref)
            self.nidx = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["c_nat"], t["s_nat"]))
            name = self.names.take(self.nidx.lookup(t["s_nat"]))
            g = (
                pa.table({"n_name": name, "ccents": t["ccents"]})
                .group_by("n_name")
                .aggregate([("ccents", "sum")])
            )
            return g.rename_columns(["n_name", "revenue_ccents"])

    return (
        joined.map_batches(
            NamePartial, batch_format="pyarrow",
            concurrency=pool_size(), num_cpus=0.5,
        )
        .groupby("n_name")
        .aggregate(Sum("revenue_ccents", alias_name="revenue_ccents"))
        .sort(["revenue_ccents", "n_name"], descending=[True, False])
    )


def q7_nation_trade_volume(
    sf_dir: str, nation_a: str = "NATION_3", nation_b: str = "NATION_8"
) -> rd.Dataset:
    """(supp_nation, cust_nation, l_year, revenue_ccents): shipped volume
    between two nations, both directions, by ship year — the TPC-H Q7
    shape. Both fact sides prune to the two nations BEFORE the one
    orderkey hash join, so the shuffle carries only cross-border rows."""
    nation = _dim(sf_dir, "nation", ["n_nationkey", "n_name"])
    sel = nation.filter(
        pc.is_in(nation["n_name"], value_set=pa.array([nation_a, nation_b]))
    )
    cust = _dim(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(
        (
            cust["c_custkey"].combine_chunks(),
            cust["c_nationkey"].combine_chunks(),
            supp["s_suppkey"].combine_chunks(),
            supp["s_nationkey"].combine_chunks(),
            sel["n_nationkey"].combine_chunks(),
            sel["n_name"].combine_chunks(),
        )
    )

    class OrderSide:
        def __init__(self):
            ck, self.cnat, _, _, nk, _ = ray.get(dims_ref)
            self.cidx = _DimIndex(ck)
            self.sel = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            cnat = self.cnat.take(self.cidx.lookup(t["o_custkey"]))
            keep = pc.is_valid(self.sel.lookup(cnat))
            return pa.table(
                {"o_orderkey": t["o_orderkey"], "c_nat": cnat}
            ).filter(keep)

    class LineSide:
        def __init__(self):
            _, _, sk, self.snat, nk, _ = ray.get(dims_ref)
            self.sidx = _DimIndex(sk)
            self.sel = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            snat = self.snat.take(self.sidx.lookup(t["l_suppkey"]))
            keep = pc.is_valid(self.sel.lookup(snat))
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "s_nat": snat,
                    "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                    "ccents": _ccents(t),
                }
            ).filter(keep)

    orders = clean_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            OrderSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema([("o_orderkey", pa.int64()), ("c_nat", pa.int64())]),
    )
    lines = clean_blocks(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ).map_batches(
            LineSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema(
            [("l_orderkey", pa.int64()), ("s_nat", pa.int64()),
             ("l_year", pa.int64()), ("ccents", pa.int64())]
        ),
    )
    joined = orders.join(
        lines,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    class Partial:
        def __init__(self):
            _, _, _, _, nk, self.names = ray.get(dims_ref)
            self.sel = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            # cross-border only: both nations are in the selected pair by
            # construction, so inequality IS the (a,b)|(b,a) predicate
            t = t.filter(pc.invert(pc.equal(t["c_nat"], t["s_nat"])))
            g = (
                pa.table(
                    {
                        "supp_nation": self.names.take(self.sel.lookup(t["s_nat"])),
                        "cust_nation": self.names.take(self.sel.lookup(t["c_nat"])),
                        "l_year": t["l_year"],
                        "ccents": t["ccents"],
                    }
                )
                .group_by(["supp_nation", "cust_nation", "l_year"])
                .aggregate([("ccents", "sum")])
            )
            return g.rename_columns(
                ["supp_nation", "cust_nation", "l_year", "revenue_ccents"]
            )

    return (
        joined.map_batches(
            Partial, batch_format="pyarrow",
            concurrency=pool_size(), num_cpus=0.5,
        )
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("revenue_ccents", alias_name="revenue_ccents"))
        .sort(["supp_nation", "cust_nation", "l_year"])
    )


def q8_market_share(
    sf_dir: str,
    nation: str = "NATION_3",
    region: str = "AMERICA",
    ptype: str = "ECONOMY",
) -> rd.Dataset:
    """(o_year, nation_revenue_ccents, total_revenue_ccents, share_4096):
    one nation's supplier share of a region's market for one part type,
    per order year — the TPC-H Q8 shape, ratio in integer 4096ths.

    Lineitem prunes to the part type and tags the supplier-nation bit
    per batch; orders prune to region customers; after the one orderkey
    join each batch reduces to one row per year."""
    nat_t = _dim(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _dim(sf_dir, "region", ["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"][0].as_py()
    nkey = nat_t.filter(pc.equal(nat_t["n_name"], nation))["n_nationkey"][0].as_py()
    in_region = pc.cast(pc.equal(nat_t["n_regionkey"], rkey), pa.int64())
    part = _dim(sf_dir, "part", ["p_partkey", "p_type"])
    is_type = pc.cast(pc.equal(part["p_type"], ptype), pa.int64())
    cust = _dim(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(
        (
            cust["c_custkey"].combine_chunks(),
            cust["c_nationkey"].combine_chunks(),
            supp["s_suppkey"].combine_chunks(),
            supp["s_nationkey"].combine_chunks(),
            nat_t["n_nationkey"].combine_chunks(),
            in_region.combine_chunks(),
            part["p_partkey"].combine_chunks(),
            is_type.combine_chunks(),
        )
    )

    class OrderSide:
        def __init__(self):
            ck, self.cnat, _, _, nk, self.inreg, _, _ = ray.get(dims_ref)
            self.cidx = _DimIndex(ck)
            self.nidx = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            cnat = self.cnat.take(self.cidx.lookup(t["o_custkey"]))
            keep = pc.equal(self.inreg.take(self.nidx.lookup(cnat)), 1)
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                }
            ).filter(keep)

    class LineSide:
        def __init__(self):
            _, _, sk, self.snat, _, _, pk, self.istype = ray.get(dims_ref)
            self.sidx = _DimIndex(sk)
            self.pidx = _DimIndex(pk)

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = pc.equal(self.istype.take(self.pidx.lookup(t["l_partkey"])), 1)
            t = t.filter(keep)
            snat = self.snat.take(self.sidx.lookup(t["l_suppkey"]))
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "is_nat": pc.cast(pc.equal(snat, nkey), pa.int64()),
                    "ccents": _ccents(t),
                }
            )

    orders = clean_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            OrderSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema([("o_orderkey", pa.int64()), ("o_year", pa.int64())]),
    )
    lines = clean_blocks(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(
            LineSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema(
            [("l_orderkey", pa.int64()), ("is_nat", pa.int64()),
             ("ccents", pa.int64())]
        ),
    )
    joined = orders.join(
        lines,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o_year": t["o_year"],
                    "nat": pc.multiply(t["ccents"], t["is_nat"]),
                    "tot": t["ccents"],
                }
            )
            .group_by("o_year")
            .aggregate([("nat", "sum"), ("tot", "sum")])
        )
        return g.rename_columns(
            ["o_year", "nation_revenue_ccents", "total_revenue_ccents"]
        )

    def share(t: pa.Table) -> pa.Table:
        return t.append_column(
            "share_4096",
            pc.divide(
                pc.multiply(t["nation_revenue_ccents"], 4096),
                pc.max_element_wise(t["total_revenue_ccents"], 1),
            ),
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("nation_revenue_ccents", alias_name="nation_revenue_ccents"),
            Sum("total_revenue_ccents", alias_name="total_revenue_ccents"),
        )
        .map_batches(share, batch_format="pyarrow")
        .sort("o_year")
    )


def q9_product_profit(sf_dir: str, name_word: str = "widget") -> rd.Dataset:
    """(n_name, o_year, profit_ccents): per supplier-nation and order
    year, revenue minus cost over parts whose name contains ``name_word``
    — the TPC-H Q9 shape, ADAPTED: the schema has no partsupp, so unit
    cost is the part's retail price (p_retailprice stands in for
    ps_supplycost; the join/aggregate structure is Q9's).

    profit = price_cents*(100-disc) - retail_cents*qty*100, all
    centi-cents."""
    nat_t = _dim(sf_dir, "nation", ["n_nationkey", "n_name"])
    part = _dim(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    match = pc.match_substring(part["p_name"], name_word)
    retail = pc.if_else(
        match, _cents(part["p_retailprice"]), pa.scalar(-1, pa.int64())
    )
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    dims_ref = ray.put(
        (
            part["p_partkey"].combine_chunks(),
            retail.combine_chunks(),
            supp["s_suppkey"].combine_chunks(),
            supp["s_nationkey"].combine_chunks(),
            nat_t["n_nationkey"].combine_chunks(),
            nat_t["n_name"].combine_chunks(),
        )
    )

    class LineSide:
        def __init__(self):
            pk, self.retail, sk, self.snat, nk, self.names = ray.get(dims_ref)
            self.pidx = _DimIndex(pk)
            self.sidx = _DimIndex(sk)
            self.nidx = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            retail = self.retail.take(self.pidx.lookup(t["l_partkey"]))
            t = t.append_column("retail_cents", retail).filter(
                pc.greater_equal(retail, 0)
            )
            qty = pc.cast(t["l_quantity"], pa.int64())
            cost = pc.multiply(pc.multiply(t["retail_cents"], qty), 100)
            snat = self.snat.take(self.sidx.lookup(t["l_suppkey"]))
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "n_name": self.names.take(self.nidx.lookup(snat)),
                    "profit_ccents": pc.subtract(_ccents(t), cost),
                }
            )

    def order_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        order_side, batch_format="pyarrow"
    )
    lines = clean_blocks(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"],
        ).map_batches(
            LineSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema(
            [("l_orderkey", pa.int64()), ("n_name", pa.string()),
             ("profit_ccents", pa.int64())]
        ),
    )
    joined = orders.join(
        lines,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["n_name", "o_year", "profit_ccents"])
            .group_by(["n_name", "o_year"])
            .aggregate([("profit_ccents", "sum")])
        )
        return g.rename_columns(["n_name", "o_year", "profit_ccents"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("profit_ccents", alias_name="profit_ccents"))
        .sort(["n_name", "o_year"])
    )


def q10_returned_revenue(
    sf_dir: str, since: str = "1997-01-01", months: int = 3, k: int = 20
) -> rd.Dataset:
    """(c_custkey, c_name, n_name, revenue_ccents): top-k customers by
    revenue lost to returned lines ('R') on orders placed in a
    ``months``-wide window — the TPC-H Q10 shape.

    Both join sides prune first (date window on orders, returnflag on
    lineitem); the per-customer aggregate is bounded by the customer
    domain and names arrive via the broadcast dim AFTER the aggregate, so
    only k+domain rows ever carry strings."""
    lo = dt.datetime.fromisoformat(since)
    mo = (lo.month - 1 + months) % 12 + 1
    hi = lo.replace(year=lo.year + (lo.month - 1 + months) // 12, month=mo)
    cust = _dim(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    nat_t = _dim(sf_dir, "nation", ["n_nationkey", "n_name"])
    dims_ref = ray.put(
        (
            cust["c_custkey"].combine_chunks(),
            cust["c_name"].combine_chunks(),
            cust["c_nationkey"].combine_chunks(),
            nat_t["n_nationkey"].combine_chunks(),
            nat_t["n_name"].combine_chunks(),
        )
    )

    def order_side(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)),
        )
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"]}
        ).filter(keep)

    def line_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "ccents": _ccents(t)}
        )

    orders = clean_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            order_side, batch_format="pyarrow"
        ),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )
    lines = clean_blocks(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        ).map_batches(line_side, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("ccents", pa.int64())]),
    )
    joined = orders.join(
        lines,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_custkey", "ccents"])
            .group_by("o_custkey")
            .aggregate([("ccents", "sum")])
        )
        return g.rename_columns(["c_custkey", "revenue_ccents"])

    class Name:
        def __init__(self):
            ck, self.cname, self.cnat, nk, self.nname = ray.get(dims_ref)
            self.cidx = _DimIndex(ck)
            self.nidx = _DimIndex(nk)

        def __call__(self, t: pa.Table) -> pa.Table:
            ci = self.cidx.lookup(t["c_custkey"])
            nat = self.cnat.take(ci)
            return pa.table(
                {
                    "c_custkey": t["c_custkey"],
                    "c_name": self.cname.take(ci),
                    "n_name": self.nname.take(self.nidx.lookup(nat)),
                    "revenue_ccents": t["revenue_ccents"],
                }
            )

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    return (
        coarse_sum(
            joined.map_batches(partial, batch_format="pyarrow"),
            ["c_custkey"], ["revenue_ccents"], coarse_parts(sf_dir) - 1,
        )
        .map_batches(
            Name, batch_format="pyarrow", concurrency=pool_size(), num_cpus=0.5
        )
        .sort(["revenue_ccents", "c_custkey"], descending=[True, False])
        .limit(k)
    )


def q4_late_ship_priority(sf_dir: str, year: int = 1997) -> rd.Dataset:
    """(o_orderpriority, n_orders): orders of one year that had at least
    one line shipped AFTER the order date, counted by priority — the
    TPC-H Q4 shape, ADAPTED: the schema has no
    l_commitdate/l_receiptdate, so "a line was late" means
    l_shipdate > o_orderdate (the correlated-EXISTS structure is Q4's).

    EXISTS(shipdate > odate) == (MAX(shipdate) > odate), so the plan is
    a per-orderkey MAX — per-batch partial first, one row per (batch,
    order) into the shuffle — then ONE join against the year's orders and
    a domain-bounded priority count. The global MAX's output cardinality
    is the ORDER count, so it resolves inside coarse orderkey partitions
    (pandas C groupby-max on integer epoch-micros), never a native
    aggregate (~10 s per 0.4M groups). All-integer timestamps end to
    end."""
    import pandas as pd

    from raycrawl.pipelines.dedup import coarse_parts

    mask = coarse_parts(sf_dir) - 1

    def li_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("ship_us", "max")])
        )
        g = g.rename_columns(["l_orderkey", "max_ship_us"])
        return g.append_column(
            "op", pc.cast(pc.bit_wise_and(g["l_orderkey"], mask), pa.int32())
        )

    def max_part(g: pd.DataFrame) -> pd.DataFrame:
        a = (
            g.groupby("l_orderkey", sort=False)["max_ship_us"]
            .max()
            .reset_index()
        )
        a["l_orderkey"] = a["l_orderkey"].astype("int64")
        a["max_ship_us"] = a["max_ship_us"].astype("int64")
        return a[["l_orderkey", "max_ship_us"]]

    per_order = clean_blocks(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("op")
        .map_groups(max_part, batch_format="pandas"),
        pa.schema([("l_orderkey", pa.int64()), ("max_ship_us", pa.int64())]),
    )

    def order_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.year(t["o_orderdate"]), year))
        return t.select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    orders = clean_blocks(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(order_side, batch_format="pyarrow"),
        pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
             ("o_orderpriority", pa.string())]
        ),
    )
    joined = orders.join(
        per_order,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.greater(t["max_ship_us"], pc.cast(t["o_orderdate"], pa.int64()))
        )
        g = t.group_by("o_orderpriority").aggregate([("o_orderkey", "count")])
        return g.rename_columns(["o_orderpriority", "n_orders"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def q16_supplier_variety(
    sf_dir: str, exclude_brand: str = "Brand#5", k: int = 20
) -> rd.Dataset:
    """(p_brand, p_type, p_size, supplier_cnt): how many DISTINCT
    suppliers shipped parts of each (brand, type, size), excluding one
    brand — the TPC-H Q16 shape, ADAPTED: no partsupp table, so "supplies"
    means "shipped at least one lineitem of the part" (the
    count-distinct-suppliers-per-part-group structure is Q16's).

    Plan: each batch resolves partkey -> (brand, type, size) through the
    broadcast dim and DEDUPES (group, suppkey) locally, so the one
    shuffle moves at most one row per (batch, group, supplier); the
    global dedup is the groupby itself; the final count is bounded by the
    group domain."""
    part = _dim(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    dims_ref = ray.put(
        (
            part["p_partkey"].combine_chunks(),
            part["p_brand"].combine_chunks(),
            part["p_type"].combine_chunks(),
            pc.cast(part["p_size"], pa.int64()).combine_chunks(),
        )
    )

    class GroupKey:
        def __init__(self):
            pk, self.brand, self.ptype, self.size = ray.get(dims_ref)
            self.pidx = _DimIndex(pk)

        def __call__(self, t: pa.Table) -> pa.Table:
            pi = self.pidx.lookup(t["l_partkey"])
            brand = self.brand.take(pi)
            g = pa.table(
                {
                    "p_brand": brand,
                    "p_type": self.ptype.take(pi),
                    "p_size": self.size.take(pi),
                    "l_suppkey": t["l_suppkey"],
                }
            ).filter(pc.invert(pc.equal(brand, exclude_brand)))
            # local dedup: one row per (group, supplier) per batch
            g = g.group_by(
                ["p_brand", "p_type", "p_size", "l_suppkey"]
            ).aggregate([])
            return g

    from raycrawl.pipelines.dedup import coarse_distinct, coarse_parts

    # distinct (group, supplier): output cardinality scales with the
    # part x supplier domain — coarse-hash partition + pandas C
    # drop_duplicates, never a native aggregate (~10 s per 0.4M groups)
    distinct = coarse_distinct(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(
            GroupKey, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        coarse_parts(sf_dir) - 1,
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["p_brand", "p_type", "p_size"])
            .aggregate([("l_suppkey", "count")])
        )
        return g.rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])

    return (
        distinct.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
        .sort(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            descending=[True, False, False, False],
        )
        .limit(k)
    )


def q20_dominant_suppliers(
    sf_dir: str, name_word: str = "red", share_denom: int = 8
) -> rd.Dataset:
    """(s_suppkey, s_name, n_parts): suppliers that shipped MORE THAN
    1/``share_denom`` of the total shipped quantity of at least one
    matching part (name contains ``name_word``), with how many such parts
    — the TPC-H Q20 shape, ADAPTED: no partsupp/availqty, so the "excess
    share" predicate is share_denom * supplier_qty > total_part_qty over
    shipped lineitems (the dominant-supplier-of-a-part structure is
    Q20's; 1/8 rather than 1/2 because parts spread over many suppliers —
    a half-share supplier does not exist even at sf0.01).

    Plan: per-batch (partkey, suppkey) quantity partials behind the
    broadcast name filter; ONE shuffle colocates each part's rows
    (coarse partkey partition); totals and the half-share test resolve
    inside the partition; the supplier count is bounded by the supplier
    domain. Deterministic: every sum is integer quantities."""
    import pandas as pd

    part = _dim(sf_dir, "part", ["p_partkey", "p_name"])
    keep_pk = part.filter(
        pc.match_substring(part["p_name"], name_word)
    )["p_partkey"]
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_name"])
    dims_ref = ray.put(
        (
            keep_pk.combine_chunks(),
            supp["s_suppkey"].combine_chunks(),
            supp["s_name"].combine_chunks(),
        )
    )
    parts = 1 << (join_parts() * 4 - 1).bit_length()

    class PairPartial:
        def __init__(self):
            pk, _, _ = ray.get(dims_ref)
            self.pidx = _DimIndex(pk)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(self.pidx.lookup(t["l_partkey"])))
            g = (
                pa.table(
                    {
                        "l_partkey": t["l_partkey"],
                        "l_suppkey": t["l_suppkey"],
                        "qty": pc.cast(t["l_quantity"], pa.int64()),
                    }
                )
                .group_by(["l_partkey", "l_suppkey"])
                .aggregate([("qty", "sum")])
            )
            g = g.rename_columns(["l_partkey", "l_suppkey", "qty"])
            return g.append_column(
                "ppart",
                pc.cast(pc.bit_wise_and(g["l_partkey"], parts - 1), pa.int32()),
            )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        a = (
            g.groupby(["l_partkey", "l_suppkey"], sort=False)["qty"]
            .sum()
            .reset_index()
        )
        tot = a.groupby("l_partkey", sort=False)["qty"].transform("sum")
        w = a[share_denom * a["qty"] > tot]
        out = w.groupby("l_suppkey", sort=False).size().reset_index(name="n")
        out["l_suppkey"] = out["l_suppkey"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["l_suppkey", "n"]]

    class Name:
        def __init__(self):
            _, sk, self.names = ray.get(dims_ref)
            self.sidx = _DimIndex(sk)

        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "s_suppkey": t["l_suppkey"],
                    "s_name": self.names.take(self.sidx.lookup(t["l_suppkey"])),
                    "n_parts": t["n"],
                }
            )

    return (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(
            PairPartial, batch_format="pyarrow",
            concurrency=pool_size(), num_cpus=1,
        )
        .groupby("ppart")
        .map_groups(per_partition, batch_format="pandas")
        .groupby("l_suppkey")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["l_suppkey", "n"]),
            batch_format="pyarrow",
        )
        .map_batches(
            Name, batch_format="pyarrow", concurrency=pool_size(), num_cpus=0.5
        )
        .sort(["n_parts", "s_suppkey"], descending=[True, False])
    )


def q6_forecast_revenue(
    sf_dir: str, year: int = 1997, disc_pct: int = 5, max_qty: int = 24
) -> rd.Dataset:
    """One row (revenue_ccents, n_items): revenue change from dropping
    small discounts on small quantities — TPC-H Q6, the pure
    filter-and-aggregate: shipdate in one year, discount within +-1pp of
    ``disc_pct``, quantity < ``max_qty``; revenue = price * discount in
    centi-cents. One stateless pass, ONE partial row per batch."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        keep = pc.and_(
            pc.and_(
                pc.equal(pc.year(t["l_shipdate"]), year),
                pc.and_(
                    pc.greater_equal(disc, disc_pct - 1),
                    pc.less_equal(disc, disc_pct + 1),
                ),
            ),
            pc.less(pc.cast(t["l_quantity"], pa.int64()), max_qty),
        )
        t = t.filter(keep)
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        rev = pc.multiply(_cents(t["l_extendedprice"]), disc)
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "revenue_ccents": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
                "n_items": pa.array([t.num_rows], pa.int64()),
            }
        )

    return (
        _read(
            sf_dir, "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("one")
        .aggregate(
            Sum("revenue_ccents", alias_name="revenue_ccents"),
            Sum("n_items", alias_name="n_items"),
        )
        .select_columns(["revenue_ccents", "n_items"])
    )


def q3_shipping_priority(
    sf_dir: str, segment: str = "BUILDING", cut: str = "1998-01-01", k: int = 10
) -> rd.Dataset:
    """(l_orderkey, o_orderdate, revenue_ccents): top-k unshipped orders
    of one customer segment by outstanding revenue — the TPC-H Q3 shape
    (ADAPTED: the schema has no o_shippriority, so the grouping key is
    (orderkey, orderdate)): orders placed before ``cut``, lines shipped
    after it.

    Plan: orders prune to the segment (broadcast custkey -> segment bit)
    and the date BEFORE the one orderkey hash join; the per-order revenue
    sum has order-cardinality output, so it resolves in coarse orderkey
    partitions; top-k via distributed sort."""
    cutoff = dt.datetime.fromisoformat(cut)
    cust = _dim(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    is_seg = pc.cast(pc.equal(cust["c_mktsegment"], segment), pa.int64())
    dims_ref = ray.put(
        (cust["c_custkey"].combine_chunks(), is_seg.combine_chunks())
    )

    class OrderSide:
        def __init__(self):
            ck, self.bits = ray.get(dims_ref)
            self.cidx = _DimIndex(ck)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff)))
            keep = pc.equal(self.bits.take(self.cidx.lookup(t["o_custkey"])), 1)
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_orderdate": t["o_orderdate"],
                }
            ).filter(keep)

    def line_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        return pa.table({"l_orderkey": t["l_orderkey"], "ccents": _ccents(t)})

    orders = clean_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            OrderSide, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
        ),
        pa.schema([("o_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us"))]),
    )
    lines = clean_blocks(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ).map_batches(line_side, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("ccents", pa.int64())]),
    )
    joined = orders.join(
        lines,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    return (
        coarse_sum(
            joined.select_columns(["o_orderkey", "o_orderdate", "ccents"]),
            ["o_orderkey", "o_orderdate"], ["ccents"],
            coarse_parts(sf_dir) - 1,
        )
        .map_batches(
            lambda t: t.rename_columns(
                ["l_orderkey", "o_orderdate", "revenue_ccents"]
            ),
            batch_format="pyarrow",
        )
        .sort(["revenue_ccents", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


def q11_important_stock(
    sf_dir: str, nation: str = "NATION_3", fraction_ppm: int = 1000
) -> rd.Dataset:
    """(l_partkey, value_ccents): parts whose shipped value from one
    nation's suppliers exceeds ``fraction_ppm`` parts-per-million of that
    nation's total shipped value — the TPC-H Q11 shape, ADAPTED: no
    partsupp/availqty, so "stock value" is shipped lineitem value
    (price * (100 - disc)) from the nation's suppliers (the
    share-of-global-threshold structure is Q11's).

    Plan: lineitem prunes to the nation's suppliers via the broadcast
    dim; per-part sums resolve in coarse partkey partitions; the global
    total is ONE scalar aggregate over the same per-part table
    (O(parts)); the threshold filter broadcasts the scalar."""
    nat_t = _dim(sf_dir, "nation", ["n_nationkey", "n_name"])
    nkey = nat_t.filter(pc.equal(nat_t["n_name"], nation))["n_nationkey"][0].as_py()
    supp = _dim(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sel = supp.filter(pc.equal(supp["s_nationkey"], nkey))["s_suppkey"]
    sel_ref = ray.put(sel.combine_chunks())

    class LineSide:
        def __init__(self):
            self.sidx = _DimIndex(ray.get(sel_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(self.sidx.lookup(t["l_suppkey"])))
            return pa.table(
                {"l_partkey": t["l_partkey"], "ccents": _ccents(t)}
            )

    from raycrawl.pipelines.dedup import clean_blocks as _cb
    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    per_part = _cb(
        coarse_sum(
            _read(
                sf_dir, "lineitem",
                ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
            ).map_batches(
                LineSide, batch_format="pyarrow",
                concurrency=pool_size(), num_cpus=1,
            ),
            ["l_partkey"], ["ccents"], coarse_parts(sf_dir) - 1,
        ),
        pa.schema([("l_partkey", pa.int64()), ("ccents", pa.int64())]),
    ).materialize()  # bounded by the part domain; read twice
    total = int(per_part.sum("ccents") or 0)

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.greater(
                pc.multiply(t["ccents"], 1_000_000),
                pa.scalar(fraction_ppm * total, pa.int64()),
            )
        )
        return t.rename_columns(["l_partkey", "value_ccents"])

    # at larger sf no part may clear the ppm threshold (sf0.1: max share
    # ~370 ppm < 1000) and Dataset.sort on an all-empty input returns a
    # SCHEMA-LESS dataset (sharp edge caught by the r5 sf0.1 gate run) —
    # clean_blocks pins the schema and the empty case skips the sort
    out_schema = pa.schema(
        [("l_partkey", pa.int64()), ("value_ccents", pa.int64())]
    )
    out = _cb(
        per_part.map_batches(keep, batch_format="pyarrow"), out_schema
    )
    if out.count() == 0:
        # a typed empty pa.Table, NOT an empty Dataset: this Ray
        # version's Dataset.to_pandas() drops the columns of an empty
        # dataset (and Dataset.sort of one returns schema None)
        return out_schema.empty_table()
    return out.sort(["value_ccents", "l_partkey"], descending=[True, False])
