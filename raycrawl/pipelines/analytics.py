"""Window / rollup / semi-anti-join / pivot analytics over the driver
tables.

Extends relops.py's relational breadth with the remaining classic
warehouse shapes (the reference has none of these — SURVEY §2.6 breadth):
per-key ordered window functions, ROLLUP grouping sets, Ray-native
left_semi / left_anti joins, and conditional-aggregation pivot. Every
query has an exact DuckDB oracle twin in ``__ray_entry__.oracle_sql``
(column names and integer-only aggregates mirrored; money in cents).

Scale shapes used here:

- window functions: ONE shuffle on a coarse 64-way key partition, then a
  single vectorized pandas pass per partition (sort + cumsum/cumcount) —
  never a per-user UDF dispatch, never a driver sort.
- rollup: the distributed fine-level aggregate is the only corpus pass;
  coarser grouping sets are derived from its output, which is bounded by
  the GROUP DOMAIN (|flags| x |statuses|), not the row count.
- semi/anti join: Ray Data's native hash-partitioned ``Dataset.join``
  with join_type left_semi / left_anti — the probe side ships only its
  key column, pre-deduped per batch so the shuffle moves distinct keys.
- pivot: per-batch conditional partial aggregation (one row per (batch,
  user)) before the one shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from raycrawl.pipelines.dedup import clean_blocks
from raycrawl.pipelines.relops import _add_upart, _cents, _DimIndex

__all__ = [
    "events_user_running",
    "lineitem_rollup",
    "customers_without_big_orders",
    "customers_with_big_orders",
    "events_pivot",
]

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def _read(sf_dir, name, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _rename(t: pa.Table, mapping: dict) -> pa.Table:
    """Rename by NAME (not position) — robust to pyarrow group_by column
    ordering."""
    return t.rename_columns([mapping.get(n, n) for n in t.column_names])


def events_user_running(sf_dir: str) -> rd.Dataset:
    """(user_id, ts_us, rn, step_cents, cum_cents): per-user ordered window
    functions — ROW_NUMBER and a running SUM over event time.

    Events are first collapsed to one row per (user, ts) (summed cents) so
    the running total is deterministic under timestamp ties; the window
    scan itself is ONE shuffle on a 64-way user partition followed by a
    single vectorized pandas pass (sort + cumcount/cumsum at C speed) per
    partition. The partitioning assumption (one user's rows fit one
    partition) is the same one every SQL engine's window hash-partitioning
    makes.
    """

    def prep(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "ts_us": pc.cast(t["ts"], pa.int64()),
                    "cents": _cents(t["value"]),
                }
            )
            .group_by(["user_id", "ts_us"])
            .aggregate([("cents", "sum")])
        )
        return _rename(g, {"cents_sum": "step_cents"})

    def running(g: pd.DataFrame) -> pd.DataFrame:
        # finish the cross-batch (user, ts) merge, then one ordered pass
        g = g.groupby(["user_id", "ts_us"], as_index=False)["step_cents"].sum()
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        by_user = g.groupby("user_id", sort=False)
        g["rn"] = by_user.cumcount().astype("int64") + 1
        g["cum_cents"] = by_user["step_cents"].cumsum().astype("int64")
        return g[["user_id", "ts_us", "rn", "step_cents", "cum_cents"]]

    return (
        _read(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(running, batch_format="pandas")
    )


def lineitem_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) over lineitem: the
    (flag, status), (flag, NULL) and (NULL, NULL) grouping sets with
    sum_qty / sum_price_cents / n_items.

    One distributed pass computes the finest level (per-batch partials,
    then a small groupby); the coarser sets are derived from that result,
    whose size is bounded by the group DOMAIN (|flags| x |statuses| — a
    handful of rows at any corpus scale), never the row count. This is the
    standard distributed-rollup plan: aggregate fine once, re-aggregate
    the tiny fine table per coarser grouping set.
    """

    def prep(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty": pc.cast(t["l_quantity"], pa.int64()),
                    "price_cents": _cents(t["l_extendedprice"]),
                    "one": pa.array(np.ones(len(t), np.int64)),
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty", "sum"), ("price_cents", "sum"), ("one", "sum")])
        )
        return _rename(
            g,
            {"qty_sum": "sum_qty", "price_cents_sum": "sum_price_cents",
             "one_sum": "n_items"},
        )

    fine = (
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n_items", alias_name="n_items"),
        )
        .to_pandas()  # bounded by the group domain, not the row count
    )
    by_flag = (
        fine.groupby("l_returnflag", as_index=False)[
            ["sum_qty", "sum_price_cents", "n_items"]
        ].sum().assign(l_linestatus=None)
    )
    total = fine[["sum_qty", "sum_price_cents", "n_items"]].sum().to_frame().T
    total["l_returnflag"] = None
    total["l_linestatus"] = None
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n_items"]
    out = pd.concat([fine[cols], by_flag[cols], total[cols]], ignore_index=True)
    for c in ("sum_qty", "sum_price_cents", "n_items"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


_CUST_SCHEMA = pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())])
_SEG_SCHEMA = pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())])
_KEY_SCHEMA = pa.schema([("o_custkey", pa.int64())])


def _order_keys(sf_dir: str, min_price: float | None = None) -> rd.Dataset:
    """orders projected to the o_custkey probe column (optionally filtered
    by price), deduped per batch so the join shuffle moves distinct keys."""

    def prep(t: pa.Table) -> pa.Table:
        if min_price is not None:
            t = t.filter(pc.greater_equal(t["o_totalprice"], min_price))
        return t.select(["o_custkey"]).group_by("o_custkey").aggregate([])

    cols = ["o_custkey"] if min_price is None else ["o_custkey", "o_totalprice"]
    ds = _read(sf_dir, "orders", cols).map_batches(prep, batch_format="pyarrow")
    # Dataset.join dies on schema-less empty blocks (tiny-sf reads and
    # filtered batches produce them) — rebuild from non-empty blocks
    return clean_blocks(ds, _KEY_SCHEMA)


def customers_without_big_orders(
    sf_dir: str, min_price: float = 450_000.0
) -> rd.Dataset:
    """(n_name, n_customers): customers with NO order at or above
    ``min_price``, counted per nation — the ANTI-join shape (TPC-H Q22's
    core), via Ray Data's native hash-partitioned ``join(..., "left_anti")``.

    Both sides shuffle only their key (+group) columns; the nation name is
    attached to the tiny post-aggregate result by broadcast lookup. (The
    price threshold keeps the result non-degenerate: on the driver corpus
    every customer has SOME order, so the unfiltered anti-join is empty.)"""
    cust = clean_blocks(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), _CUST_SCHEMA
    )
    no_orders = cust.join(
        _order_keys(sf_dir, min_price=min_price),
        join_type="left_anti",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    lookup_ref = ray.put(
        (nation["n_nationkey"].combine_chunks(), nation["n_name"].combine_chunks())
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_nationkey").aggregate([("c_custkey", "count")])
        return _rename(g, {"c_custkey_count": "n_customers"})

    class AttachName:
        def __init__(self):
            keys, self.vals = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)  # built once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "n_name": self.vals.take(self.idx.lookup(t["c_nationkey"])),
                    "n_customers": t["n_customers"],
                }
            )

    return (
        no_orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        # fractional-CPU actors: full-CPU pools deadlock against the join's
        # aggregator actors on small clusters (see raycrawl-env-quirks)
        .map_batches(AttachName, batch_format="pyarrow", concurrency=2,
                     num_cpus=0.5)
    )


def customers_with_big_orders(sf_dir: str, min_price: float = 450_000.0) -> rd.Dataset:
    """(c_mktsegment, n_customers): customers with at least one order at or
    above ``min_price``, counted per market segment — the SEMI-join shape,
    via Ray Data's native ``join(..., "left_semi")``. The probe side is
    filtered at the read and deduped per batch, so the shuffle moves the
    distinct qualifying keys only."""
    cust = clean_blocks(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]), _SEG_SCHEMA
    )
    qualified = cust.join(
        _order_keys(sf_dir, min_price=min_price),
        join_type="left_semi",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate([("c_custkey", "count")])
        return _rename(g, {"c_custkey_count": "n_customers"})

    return (
        qualified.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


def events_pivot(sf_dir: str) -> rd.Dataset:
    """(user_id, click_cents, view_cents, purchase_cents, signup_cents,
    error_cents, n_events): the event stream pivoted to one row per user
    with per-event-type value totals — conditional aggregation (the
    distributed PIVOT plan: the type domain is a fixed column set, so the
    pivot is five masked sums computed batch-local, then ONE shuffle of
    per-(batch, user) partial rows)."""

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        zero = pa.scalar(0, pa.int64())
        cols = {"user_id": t["user_id"]}
        for et in _EVENT_TYPES:
            cols[f"{et}_cents"] = pc.if_else(
                pc.equal(t["event_type"], et), cents, zero
            )
        cols["n_events"] = pa.array(np.ones(len(t), np.int64))
        g = pa.table(cols).group_by("user_id").aggregate(
            [(c, "sum") for c in list(cols) if c != "user_id"]
        )
        return _rename(
            g, {f"{c}_sum": c for c in list(cols) if c != "user_id"}
        )

    aggs = [
        Sum(f"{et}_cents", alias_name=f"{et}_cents") for et in _EVENT_TYPES
    ] + [Sum("n_events", alias_name="n_events")]
    return (
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*aggs)
    )
