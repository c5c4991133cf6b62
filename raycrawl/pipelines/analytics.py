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

from raycrawl.pipelines.dedup import clean_blocks, coarse_parts, coarse_sum
from raycrawl.pipelines.relops import (
    _add_upart,
    _cents,
    _DimIndex,
    join_parts,
    pool_size,
)

__all__ = [
    "events_user_running",
    "lineitem_rollup",
    "lineitem_cube",
    "customers_without_big_orders",
    "customers_with_big_orders",
    "events_pivot",
    "small_quantity_revenue",
    "events_funnel",
    "events_user_paths",
    "events_outliers",
    "events_cohort_retention",
    "events_close_pairs",
    "nation_customer_supplier_outer",
    "orders_count_distribution",
    "top_customer_orders",
    "events_latest_state",
    "orders_merge_upsert",
    "events_watermark_late",
    "customers_above_avg_inactive",
    "suppliers_sole_returns",
    "supplier_top_revenue",
    "promo_revenue_share",
    "part_cheapest_supplier",
    "events_mode_type",
    "events_wau",
    "table_profile",
    "events_weekly_trend",
    "events_conversion_lag",
    "events_user_value_deciles",
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

    fine_ds = (
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n_items", alias_name="n_items"),
        )
        .materialize()
    )
    # the driver-side re-aggregation below is bounded by the GROUPING-KEY
    # domain (flag x status: a handful of rows), never the row count —
    # guard it so a high-cardinality key misuse fails loudly, not as a
    # driver OOM (count() is metadata-only after materialize)
    if fine_ds.count() > 100_000:
        raise ValueError(
            "lineitem_rollup: grouping-key domain too large for driver-side "
            "grouping-set re-aggregation; aggregate each grouping set "
            "distributedly instead"
        )
    fine = fine_ds.to_pandas()
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


def lineitem_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping sets —
    rollup's three plus (NULL, status). Same distributed plan as
    :func:`lineitem_rollup` (one corpus pass for the fine level, every
    coarser set re-aggregated from the domain-bounded fine table); CUBE
    only adds one more tiny driver-side re-aggregate."""
    fine_tbl = lineitem_rollup(sf_dir).to_pandas()
    fine = fine_tbl[fine_tbl["l_linestatus"].notna()]
    by_status = (
        fine.groupby("l_linestatus", as_index=False)[
            ["sum_qty", "sum_price_cents", "n_items"]
        ].sum().assign(l_returnflag=None)
    )
    cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents",
            "n_items"]
    out = pd.concat([fine_tbl[cols], by_status[cols]], ignore_index=True)
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
        num_partitions=join_parts(),
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
        .map_batches(AttachName, batch_format="pyarrow", concurrency=pool_size(),
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
        num_partitions=join_parts(),
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


def small_quantity_revenue(sf_dir: str) -> pa.Table:
    """(revenue_cents, n_items): revenue from lineitems whose quantity is
    below 20% of their part's average order quantity — the TPC-H Q17
    correlated-aggregate shape.

    The per-part average is a distributed aggregate over the SAME fact
    table, joined back by Ray Data's native hash-partitioned join (one row
    per part — too large to broadcast at scale, so this is the big-big
    join shape, unlike the dimension broadcasts in relops). The threshold
    is evaluated in pure integers: qty < 0.2 * (sum/n)  <=>  5*qty*n < sum
    — exact on both engines, no float division anywhere."""

    def qty_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "qty": pc.cast(t["l_quantity"], pa.int64()),
                    "one": pa.array(np.ones(len(t), np.int64)),
                }
            )
            .group_by("l_partkey")
            .aggregate([("qty", "sum"), ("one", "sum")])
        )
        return _rename(g, {"qty_sum": "s", "one_sum": "n"})

    per_part = clean_blocks(
        coarse_sum(
            _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
            .map_batches(qty_partial, batch_format="pyarrow"),
            ["l_partkey"], ["s", "n"], coarse_parts(sf_dir) - 1,
        ),
        pa.schema([("l_partkey", pa.int64()), ("s", pa.int64()),
                   ("n", pa.int64())]),
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pk": t["l_partkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    items = clean_blocks(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow"),
        pa.schema([("pk", pa.int64()), ("qty", pa.int64()),
                   ("price_cents", pa.int64())]),
    )

    def small_partial(t: pa.Table) -> pa.Table:
        keep = pc.less(
            pc.multiply(pc.multiply(t["qty"], 5), t["n"]), t["s"]
        )
        kept = t.filter(keep)
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [pc.sum(kept["price_cents"]).as_py() or 0], pa.int64()
                ),
                "n_items": pa.array([kept.num_rows], pa.int64()),
            }
        )

    partials = (
        items.join(per_part, join_type="inner", num_partitions=join_parts(),
                   on=("pk",), right_on=("l_partkey",))
        .map_batches(small_partial, batch_format="pyarrow")
        .to_arrow_refs()  # bounded: ONE partial row per block
    )
    out = pa.concat_tables(
        [x for x in ray.get(partials) if x.num_rows]
    ).combine_chunks()
    return pa.table(
        {
            "revenue_cents": pa.array(
                [pc.sum(out["revenue_cents"]).as_py() or 0], pa.int64()
            ),
            "n_items": pa.array(
                [pc.sum(out["n_items"]).as_py() or 0], pa.int64()
            ),
        }
    )


def events_funnel(sf_dir: str, window_s: int = 3600) -> pa.Table:
    """(n_signup_users, n_purchase_users, n_converted): funnel analysis —
    users who signed up, users who purchased, and users whose FIRST
    purchase after their first signup landed within ``window_s`` seconds
    of it (ordered-sequence matching with a conversion window, the
    product-analytics funnel shape).

    The order dependence is resolved with ONE shuffle: signup/purchase
    events partition by the coarse 64-way user key, and a single pandas
    pass per partition computes each user's first-signup time, joins it
    onto that user's purchases (C-speed reindex), and reduces to THREE
    partial counters per partition. The driver sums <=64 counter rows —
    no per-user state ever leaves the partitions."""
    win_us = window_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"], value_set=pa.array(["signup", "purchase"]))
        t = t.filter(mask)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "is_signup": pc.equal(t["event_type"], "signup"),
            }
        )

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        fs = g[g["is_signup"]].groupby("user_id")["ts_us"].min()
        p = g[~g["is_signup"]]
        n_signup = int(fs.size)
        n_buy = int(p["user_id"].nunique())
        fs_of = fs.reindex(p["user_id"]).to_numpy(dtype="float64")
        pts = p["ts_us"].to_numpy(dtype="float64")
        after = p[(pts > fs_of)]  # NaN (no signup) compares False
        if len(after):
            fpa = after.groupby("user_id")["ts_us"].min()
            n_conv = int((fpa - fs.reindex(fpa.index) <= win_us).sum())
        else:
            n_conv = 0
        return pd.DataFrame(
            {
                "n_signup_users": pd.array([n_signup], "int64"),
                "n_purchase_users": pd.array([n_buy], "int64"),
                "n_converted": pd.array([n_conv], "int64"),
            }
        )

    parts = (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(funnel, batch_format="pandas")
        .to_arrow_refs()  # bounded: <=64 one-row partials
    )
    out = pa.concat_tables(
        [x.select(["n_signup_users", "n_purchase_users", "n_converted"])
         for x in ray.get(parts) if x.num_rows]
    ).combine_chunks()
    return pa.table(
        {
            c: pa.array([pc.sum(out[c]).as_py() or 0], pa.int64())
            for c in ("n_signup_users", "n_purchase_users", "n_converted")
        }
    )


def events_user_paths(sf_dir: str) -> rd.Dataset:
    """(user_id, path, n_events): each user's full ordered event-type
    sequence joined with '>' — the clickstream/path-analysis aggregation
    (ordered string agg). Ordering is (ts, event_id) — event_id is unique,
    so the sequence is deterministic under timestamp ties on both engines.

    One shuffle on the coarse 64-way user partition, then a single sorted
    pandas pass per partition; the per-user join cost is O(its events),
    the same bound any ordered-aggregation engine pays."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
            }
        )

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        agg = g.groupby("user_id", sort=False)["event_type"].agg(
            [(">".join), "size"]
        )
        agg.columns = ["path", "n_events"]
        out = agg.reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "path", "n_events"]]

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(paths, batch_format="pandas")
    )


def events_outliers(sf_dir: str, z: int = 2) -> rd.Dataset:
    """(user_id, n_outliers): per-user anomaly detection — count each
    user's events whose value lies more than ``z`` population standard
    deviations from that user's mean, decided in PURE integers so the
    oracle reproduces it bit-for-bit: with per-user n, s=sum(cents),
    ssq=sum(cents^2), event x is an outlier iff

        (n*x - s)^2  >  z^2 * (n*ssq - s^2)        (n >= 2)

    (multiply the z-score inequality through by n^2 — no division, no
    floats). Users with zero outliers are omitted.

    Scale shape: ONE shuffle on the coarse 64-way user partition, then a
    single pandas pass per partition (C-speed groupby for the moments, a
    reindex join-back, one vectorized mask). int64 headroom: needs
    n*ssq < 2^63/z^2, i.e. per-user event counts up to ~10^5 at
    dollar-scale values; beyond that the moments column switches to
    python-int (object) per partition.
    """
    z2 = z * z

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "cents": _cents(t["value"])}
        )

    def outliers(g: pd.DataFrame) -> pd.DataFrame:
        st = g.groupby("user_id")["cents"].agg(["count", "sum"])
        sq = g.assign(sq=g["cents"] ** 2).groupby("user_id")["sq"].sum()
        n = st["count"].reindex(g["user_id"]).to_numpy()
        s = st["sum"].reindex(g["user_id"]).to_numpy()
        ssq = sq.reindex(g["user_id"]).to_numpy()
        x = g["cents"].to_numpy()
        d = n * x - s
        mask = (n >= 2) & (d * d > z2 * (n * ssq - s * s))
        out = (
            g.loc[mask]
            .groupby("user_id")
            .size()
            .rename("n_outliers")
            .reset_index()
        )
        out["n_outliers"] = out["n_outliers"].astype("int64")
        return out[["user_id", "n_outliers"]]

    return (
        _read(sf_dir, "events", ["user_id", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(outliers, batch_format="pandas")
    )


def events_close_pairs(sf_dir: str, window_s: int = 300) -> rd.Dataset:
    """(user_id, n_pairs): band self-join — for every user, the number of
    UNORDERED event pairs whose timestamps lie within ``window_s`` of
    each other. The theta/interval self-join shape (co-occurrence,
    burst detection) that a naive engine evaluates as an O(n²) join.

    Scale shape: ONE shuffle on the coarse user partition, then per
    partition a single sort + vectorized two-pointer count — for sorted
    times t, pairs = Σ_i (searchsorted(t, t_i + W, 'right') − i − 1) —
    O(n log n) per user instead of the join's O(n²) worst case. Users
    with zero qualifying pairs are omitted (SQL GROUP BY over the join
    does the same)."""
    win_us = window_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "ts_us": pc.cast(t["ts"], pa.int64())}
        )

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        out_u, out_n = [], []
        for u, grp in g.groupby("user_id", sort=False):
            t = grp["ts_us"].to_numpy()
            hi = np.searchsorted(t, t + win_us, side="right")
            n = int((hi - np.arange(len(t)) - 1).sum())
            if n:
                out_u.append(u)
                out_n.append(n)
        return pd.DataFrame(
            {
                "user_id": pd.array(out_u, "int64"),
                "n_pairs": pd.array(out_n, "int64"),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(count_pairs, batch_format="pandas")
    )


_WEEK_US = 7 * 86_400 * 1_000_000


def events_cohort_retention(sf_dir: str) -> rd.Dataset:
    """(cohort_week, week_offset, n_users): cohort retention — users are
    cohorted by the epoch-week of their FIRST event; for every later week
    in which a cohort member is active, count the distinct members. The
    product-analytics retention triangle.

    Scale shape: ONE shuffle on the coarse 64-way user partition. Within a
    partition a user's rows are complete, so the per-(cohort, offset)
    distinct-user partials from disjoint partitions sum EXACTLY — the
    global aggregate is a tiny groupby over O(cohorts x offsets x 64)
    rows, never a distinct over the corpus."""

    def prep(t: pa.Table) -> pa.Table:
        wk = pc.divide(pc.cast(t["ts"], pa.int64()), _WEEK_US)
        return pa.table({"user_id": t["user_id"], "week": wk})

    def retention(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("user_id")["week"].min()
        uw = g.drop_duplicates(["user_id", "week"])
        cohort = first.reindex(uw["user_id"]).to_numpy()
        out = (
            pd.DataFrame(
                {
                    "cohort_week": cohort,
                    "week_offset": uw["week"].to_numpy() - cohort,
                }
            )
            .groupby(["cohort_week", "week_offset"])
            .size()
            .rename("n_users")
            .reset_index()
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(retention, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def nation_customer_supplier_outer(sf_dir: str) -> rd.Dataset:
    """(nationkey, n_building_customers, n_rich_suppliers): per-nation
    counts of rich (acctbal > 9000) BUILDING-segment customers FULL OUTER
    JOINed with counts of suppliers with acctbal > 5000 — nations holding
    only one side appear with a 0 on the other (at sf0.01 the filters
    leave 4 nations customer-only and 4 supplier-only, so both outer
    directions are exercised for real). Ray Data's native full_outer
    hash join.

    Scale shape: both sides are aggregated to one row per nation BEFORE
    the join (per-batch partials, then a domain-bounded groupby), so the
    full-outer shuffle moves O(nations) rows regardless of corpus size."""

    def cust_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t["c_mktsegment"], "BUILDING"),
                pc.greater(t["c_acctbal"], 9000.0),
            )
        )
        g = (
            pa.table({"nationkey": t["c_nationkey"]})
            .group_by("nationkey")
            .aggregate([("nationkey", "count")])
        )
        return _rename(g, {"nationkey_count": "n_building_customers"})

    def supp_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["s_acctbal"], 5000.0))
        g = (
            pa.table({"nationkey_r": t["s_nationkey"]})
            .group_by("nationkey_r")
            .aggregate([("nationkey_r", "count")])
        )
        return _rename(g, {"nationkey_r_count": "n_rich_suppliers"})

    cust = clean_blocks(
        _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"])
        .map_batches(cust_partial, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("n_building_customers", alias_name="n_building_customers")),
        pa.schema(
            [("nationkey", pa.int64()), ("n_building_customers", pa.int64())]
        ),
    )
    supp = clean_blocks(
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(supp_partial, batch_format="pyarrow")
        .groupby("nationkey_r")
        .aggregate(Sum("n_rich_suppliers", alias_name="n_rich_suppliers")),
        pa.schema(
            [("nationkey_r", pa.int64()), ("n_rich_suppliers", pa.int64())]
        ),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's join merges on/right_on into ONE key column, filled from
        # whichever side matched; only the count columns can be null here.
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "nationkey": t["nationkey"],
                "n_building_customers": pc.coalesce(
                    pc.cast(t["n_building_customers"], pa.int64()), zero
                ),
                "n_rich_suppliers": pc.coalesce(
                    pc.cast(t["n_rich_suppliers"], pa.int64()), zero
                ),
            }
        )

    return cust.join(
        supp,
        join_type="full_outer",
        num_partitions=4,
        on=("nationkey",),
        right_on=("nationkey_r",),
    ).map_batches(finish, batch_format="pyarrow")


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

    vals = [f"{et}_cents" for et in _EVENT_TYPES] + ["n_events"]
    return coarse_sum(
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow"),
        ["user_id"], vals, coarse_parts(sf_dir) - 1,
    )


# ---------------------------------------------------------------------------
# round 4: customer-order distribution (Q13 shape), large-volume customers
# (Q18 shape)
# ---------------------------------------------------------------------------

_BIG_SCHEMA = pa.schema([("l_orderkey", pa.int64()), ("total_qty", pa.int64())])
_ORD_SCHEMA = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_custkey", pa.int64()),
        ("o_totalprice_cents", pa.int64()),
    ]
)
_CNAME_SCHEMA = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())])


def orders_count_distribution(sf_dir: str) -> pa.Table:
    """(n_orders, n_customers): how many customers placed exactly N orders
    — the TPC-H Q13 shape (outer-join count distribution), including the
    zero-order bucket.

    Scale shape: the per-customer count is a distributed
    aggregate-of-an-aggregate (per-batch partial counts before the one
    custkey shuffle); the histogram over counts is a second
    domain-bounded aggregate (one row per DISTINCT order count). The
    zero bucket needs no outer join at all: it is ``|customer| -
    |customers with >=1 order|``, the first a metadata count, the second
    the histogram's own mass — so the customer table is never shuffled.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return _rename(g, {"o_custkey_count": "n"})

    per_cust = coarse_sum(
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], ["n"], coarse_parts(sf_dir) - 1,
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "n_orders"]),
        batch_format="pyarrow",
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["n_orders"])
            .group_by("n_orders")
            .aggregate([("n_orders", "count")])
        )
        return _rename(g, {"n_orders_count": "n_customers"})

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .take_all()  # bounded by the max-orders-per-customer domain
    )
    rows = sorted((int(r["n_orders"]), int(r["n_customers"])) for r in hist)
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    n_zero = n_cust - sum(c for _, c in rows)
    if n_zero > 0:
        rows.insert(0, (0, n_zero))
    return pa.table(
        {
            "n_orders": pa.array([a for a, _ in rows], pa.int64()),
            "n_customers": pa.array([b for _, b in rows], pa.int64()),
        }
    )


def top_customer_orders(
    sf_dir: str, min_qty: int = 300, k: int = 10
) -> rd.Dataset:
    """(c_custkey, c_name, o_orderkey, o_totalprice_cents, total_qty): the
    k most expensive orders among those whose total line quantity exceeds
    ``min_qty`` — the TPC-H Q18 shape (HAVING filter on a fact aggregate,
    then two joins up the dimension chain, then top-k).

    Scale shape: the quantity aggregate is partial per batch before its
    one orderkey shuffle, and the HAVING filter runs on the AGGREGATED
    table, so only qualifying orderkeys (a tiny fraction) enter the join
    graph. Both joins are Ray-native hash joins (orders and customer are
    fact-sized at 100 TB — neither broadcasts); the final sort/limit runs
    on the filtered join output, bounded by the qualifier count.
    """

    def qty_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "qty": pc.cast(t["l_quantity"], pa.int64()),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("qty", "sum")])
        )
        return _rename(g, {"qty_sum": "total_qty"})

    def keep_big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["total_qty"], min_qty))

    big = clean_blocks(
        coarse_sum(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
            .map_batches(qty_partial, batch_format="pyarrow"),
            ["l_orderkey"], ["total_qty"], coarse_parts(sf_dir) - 1,
        ).map_batches(keep_big, batch_format="pyarrow"),
        _BIG_SCHEMA,
    )

    def prep_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_totalprice_cents": _cents(t["o_totalprice"]),
            }
        )

    orders = clean_blocks(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
        ).map_batches(prep_orders, batch_format="pyarrow"),
        _ORD_SCHEMA,
    )
    cust = clean_blocks(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]), _CNAME_SCHEMA
    )

    # clean_blocks between the chained joins: a join's empty output
    # partitions are SCHEMA-LESS blocks, and when one reaches the second
    # join's aggregator first the key resolution rejects the whole
    # partition ("No match ... FieldRef.Name(o_custkey)") — the Ray 2.49
    # empty-block sharp edge, racy because it depends on bundle order
    big_orders = clean_blocks(
        orders.join(
            big,
            join_type="inner",
            num_partitions=join_parts(),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        ),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice_cents", pa.int64()),
                ("total_qty", pa.int64()),
            ]
        ),
    )
    joined = big_orders.join(
        cust,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def project(t: pa.Table) -> pa.Table:
        # Dataset.join drops the RIGHT key column; the surviving left key
        # carries the same value (inner equi-join), so alias it back
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "o_orderkey": t["o_orderkey"],
                "o_totalprice_cents": t["o_totalprice_cents"],
                "total_qty": t["total_qty"],
            }
        )

    return (
        joined.map_batches(project, batch_format="pyarrow")
        .sort(["o_totalprice_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def events_latest_state(sf_dir: str) -> rd.Dataset:
    """(user_id, last_type, last_ts_us, last_cents): CDC latest-wins
    compaction — collapse the event changelog to each key's current row
    (ordered by ts then event_id, so ties are deterministic), treating a
    latest row of type 'error' as a tombstone that DELETES the key. This
    is the streaming upsert/compaction primitive behind every
    changelog-to-table materialization (Delta/Hudi MERGE, Kafka compacted
    topics).

    Scale shape: latest-per-key is associative, so each batch is first
    compacted to one row per key it contains (a vectorized pandas
    sort+tail per batch) — the shuffle then moves at most one row per
    (batch, user), never the changelog. The final per-partition pass
    re-compacts across batches inside a coarse user partition
    (``_add_upart``) and applies the tombstone filter.
    """

    def prep(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "ts_us": pc.cast(t["ts"], pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
                "event_id": t["event_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pandas(),
                "cents": _cents(t["value"]).to_numpy(zero_copy_only=False),
            }
        )
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        return g.groupby("user_id", sort=False).tail(1)

    def latest(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        last = g.groupby("user_id", sort=False).tail(1)
        live = last[last["event_type"] != "error"]
        # typed Arrow output: an all-tombstone partition is a ZERO-ROW
        # block, and Ray's pandas size estimator chokes on empty object
        # columns (np.vectorize size-0) — Arrow empties carry their schema
        return pa.table(
            {
                "user_id": pa.array(
                    live["user_id"].to_numpy(np.int64)),
                "last_type": pa.array(
                    live["event_type"].astype(object), pa.string()),
                "last_ts_us": pa.array(
                    live["ts_us"].to_numpy(np.int64)),
                "last_cents": pa.array(
                    live["cents"].to_numpy(np.int64)),
            }
        )

    return (
        _read(sf_dir, "events",
              ["user_id", "ts", "event_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(latest, batch_format="pandas")
    )


def orders_merge_upsert(sf_dir: str) -> rd.Dataset:
    """(o_orderkey, price_cents, status): Delta-style MERGE of a change
    set into the orders base table — the lakehouse upsert primitive
    (MERGE INTO base USING changes: update matched, delete matched
    tombstones, insert unmatched). The change set is derived
    deterministically from the base so both engines see identical bytes:
    keys % 13 == 0 are deletes, other keys % 7 == 0 are re-priced
    +1000.00, and keys % 11 == 0 spawn an insert under key + 10^9.

    Scale shape: the MERGE is ONE hash-partitioned left_outer join of
    base against the (much smaller) keyed change set — deletes drop,
    updates coalesce, untouched rows pass through — plus a shuffle-free
    union of the inserts. Never a full rewrite of unmatched partitions:
    at petabyte scale the join keys would carry the partition id so only
    touched partitions rewrite, which this single-join shape preserves.
    """

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["o_orderkey"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    base = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow"
    )

    def make_changes(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        sel = (k % 7 == 0) | (k % 13 == 0)
        k, cents = k[sel], cents[sel]
        is_del = k % 13 == 0
        return pa.table(
            {
                "ck": pa.array(k, pa.int64()),
                "op": pa.array(np.where(is_del, "D", "U"), pa.string()),
                "new_cents": pa.array(cents + 100_000, pa.int64()),
            }
        )

    def make_inserts(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        sel = k % 11 == 0
        return pa.table(
            {
                "o_orderkey": pa.array(k[sel] + 1_000_000_000, pa.int64()),
                "price_cents": pa.array(cents[sel], pa.int64()),
                "status": pa.array(["inserted"] * int(sel.sum()), pa.string()),
            }
        )

    # clean_blocks: a small base can leave the change set with schema-less
    # empty blocks, which the join's key resolution rejects
    changes = clean_blocks(
        base.map_batches(make_changes, batch_format="pyarrow"),
        pa.schema([("ck", pa.int64()), ("op", pa.string()),
                   ("new_cents", pa.int64())]),
    )
    inserts = base.map_batches(make_inserts, batch_format="pyarrow")

    def apply_merge(t: pa.Table) -> pa.Table:
        op = t["op"].to_numpy(zero_copy_only=False)
        keep = op != "D"  # None (unmatched) != 'D' -> kept
        t = t.filter(pa.array(keep))
        upd = pc.equal(t["op"], "U")
        return pa.table(
            {
                "o_orderkey": t["k"],
                "price_cents": pc.if_else(
                    pc.fill_null(upd, False), t["new_cents"], t["cents"]
                ),
                "status": pc.if_else(
                    pc.fill_null(upd, False), "updated", "base"
                ),
            }
        )

    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("price_cents", pa.int64()),
         ("status", pa.string())]
    )
    merged = clean_blocks(
        base.join(changes, join_type="left_outer",
                  num_partitions=join_parts(), on=("k",), right_on=("ck",))
        .map_batches(apply_merge, batch_format="pyarrow"),
        out_schema,
    )
    return merged.union(clean_blocks(inserts, out_schema))


def events_json_extract(sf_dir: str) -> rd.Dataset:
    """(event_type, n_events, sum_k, min_k, max_k): semi-structured
    ingestion — extract the integer ``k`` field from the JSON ``props``
    column and aggregate it per event type.

    The extraction is one vectorized RE2 kernel per batch
    (``pc.extract_regex`` — no per-row json.loads), and the aggregate is
    pre-combined inside each batch before the shuffle, so at most one row
    per (batch, event_type) moves: the partial-agg shape every
    changelog-scale JSON scan needs. Rows whose props lack the field are
    counted with k ignored (null-safe), matching SQL aggregate semantics.
    """

    def partial(t: pa.Table) -> pd.DataFrame:
        ext = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        g = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "k": k.to_pandas(),
            }
        )
        agg = g.groupby("event_type", sort=False).agg(
            n_events=("k", "size"),
            sum_k=("k", "sum"),
            min_k=("k", "min"),
            max_k=("k", "max"),
        ).reset_index()
        # pandas sum over all-null -> 0.0 float; keep int64 + null-safety
        agg["sum_k"] = agg["sum_k"].astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("event_type", sort=False).agg(
            n_events=("n_events", "sum"),
            sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"),
            max_k=("max_k", "max"),
        ).reset_index()
        return out

    return (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


def docs_linreg(sf_dir: str) -> rd.Dataset:
    """(lang, n, slope_num, slope_den, icept_num, icept_den): per-language
    simple linear regression of whitespace-token count on character count,
    kept EXACT as integer numerator/denominator pairs:

        slope     = (n*Σxy - Σx*Σy) / (n*Σxx - Σx²)
        intercept = (Σy*slope_den - slope_num*Σx) / (n*slope_den)

    The distributed shape is the one every sufficient-statistics model fit
    uses (the k-means/PageRank integer trick applied to OLS): each batch
    emits one partial (n, Σx, Σy, Σxx, Σxy) row per language it contains,
    the shuffle moves only those partials, and the closed form runs on the
    tiny per-language totals. int64 bounds: |Σxx| ≤ n·max(x)²; at corpus
    scale beyond ~1e12 rows switch the two product columns to
    decimal128 — documented, not needed at any test scale.
    """

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        g = pd.DataFrame(
            {
                "lang": t["lang"].to_pandas(),
                "n": 1,
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "sxy": x * y,
            }
        )
        return (
            g.groupby("lang", sort=False)[["n", "sx", "sy", "sxx", "sxy"]]
            .sum()
            .reset_index()
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("lang", sort=False)[["n", "sx", "sy", "sxx", "sxy"]] \
            .sum().reset_index()
        s["slope_num"] = s["n"] * s["sxy"] - s["sx"] * s["sy"]
        s["slope_den"] = s["n"] * s["sxx"] - s["sx"] * s["sx"]
        s["icept_num"] = s["sy"] * s["slope_den"] - s["slope_num"] * s["sx"]
        s["icept_den"] = s["n"] * s["slope_den"]
        return s[["lang", "n", "slope_num", "slope_den",
                  "icept_num", "icept_den"]]

    from raycrawl.pipelines.textops import _read_docs

    return (
        _read_docs(sf_dir, ["lang", "n_chars", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


# simulated-arrival mixer for the watermark op: its own odd-multiplier
# affine constants so the arrival permutation is independent of the
# split / shard / sampler hashes (same independence argument as
# textops.shuffle_shards).
_ARRIVAL_MUL = 0xD1342543DE82EF95
_ARRIVAL_ADD = 0x94D049BB133111EB


def events_watermark_late(
    sf_dir: str, lateness_s: int = 15 * 86400
) -> rd.Dataset:
    """(event_id, ts_us, wm_us, late): streaming watermark / late-data
    classification — the ingestion rule a windowed streaming engine
    applies to out-of-order input (SURVEY §2.6 lists watermarks as absent
    from the reference; this is the missing-late-data primitive).

    The driver events table is time-ordered by construction, so the
    arrival stream is SIMULATED with a deterministic affine-hash
    permutation of event_id (network-jitter stand-in; distinct mixer
    constants keep it independent of every other hash in the repo). The
    watermark of an event is the max event time over all PRIOR arrivals;
    the event is late iff its own time lags that watermark by more than
    ``lateness_s`` — exactly the row a tumbling-window engine would drop
    or side-output. ``wm_us == -1`` marks the stream's first arrival (no
    watermark yet, never late).

    Scale shape: a global running max is a prefix scan, so this reuses
    the distributed two-pass plan of :func:`~raycrawl.pipelines.textops.
    pack_manifest` with max instead of sum. The arrival hash's top bits
    give contiguous arrival-range partitions; pass 1 reduces each range
    to ONE max (driver collect is O(parts), never O(events)); pass 2
    ships only 4 integer columns into the one range shuffle and seeds
    each partition's vectorized exclusive cummax with the broadcast
    prefix max of all earlier ranges. Partition width is the session
    knob (relops._UPART_N); the output is partition-count-invariant.
    """
    from ray.data.aggregate import Max

    from raycrawl.pipelines.relops import _UPART_N

    shift = np.uint64(64 - (_UPART_N.bit_length() - 1))
    lateness_us = lateness_s * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = ids * np.uint64(_ARRIVAL_MUL) + np.uint64(_ARRIVAL_ADD)
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "hv": pa.array(hv, pa.uint64()),
                "part": pa.array((hv >> shift).astype(np.int64)),
            }
        )

    def part_max(t: pa.Table) -> pa.Table:
        g = tag(t).select(["part", "ts_us"]).group_by("part").aggregate(
            [("ts_us", "max")]
        )
        return _rename(g, {"ts_us_max": "mx"})

    maxima = (
        _read(sf_dir, "events", ["event_id", "ts"])
        .map_batches(part_max, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Max("mx", alias_name="mx"))
        .take_all()  # one row per arrival range — O(parts), tiny
    )
    base: dict[int, int] = {}
    run = -1
    for r in sorted(maxima, key=lambda r: r["part"]):
        base[int(r["part"])] = run
        run = max(run, int(r["mx"]))

    def watermark(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(), g["hv"].to_numpy()))
        ids = g["event_id"].to_numpy()[order]
        ts = g["ts_us"].to_numpy(np.int64)[order]
        seed = base[int(g["part"].iloc[0])]
        wm = np.empty(len(ts), np.int64)
        wm[0] = seed
        if len(ts) > 1:
            np.maximum(
                np.maximum.accumulate(ts[:-1]), seed, out=wm[1:]
            )
        return pd.DataFrame(
            {
                "event_id": ids,
                "ts_us": ts,
                "wm_us": wm,
                "late": (ts < wm - lateness_us).astype(np.int64),
            }
        )

    return (
        _read(sf_dir, "events", ["event_id", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(watermark, batch_format="pandas")
    )


def customers_above_avg_inactive(
    sf_dir: str, priority: str = "1-URGENT"
) -> rd.Dataset:
    """(c_nationkey, n_cust, total_bal_cents): customers whose balance is
    strictly above the average POSITIVE balance yet who never placed a
    ``priority`` order — the TPC-H Q22 shape: a global scalar subquery
    feeding a filter, then an anti-join against the fact table. (Scoping
    the anti-join to urgent orders keeps the result non-degenerate: on
    the driver corpus every customer has SOME order.)

    Scale shape: the scalar (count, sum of positive balances) reduces to
    ONE driver row via per-batch partials (never a collect of customers);
    the threshold broadcasts into a stateless filter; the anti-join is
    Ray-native hash-partitioned ``left_anti`` over key columns only; the
    final aggregate is bounded by the nation domain. Exact integers
    throughout (cents trick)."""

    def scalar_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        pos = pc.filter(cents, pc.greater(cents, 0))
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
                "s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
            }
        )

    row = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(scalar_partial, batch_format="pyarrow")
        .groupby("one")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .take_all()  # bounded: exactly one row
    )
    n_pos, s_pos = (row[0]["n"], row[0]["s"]) if row else (0, 0)

    def above_avg(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        # cents > s/n as exact integers: cents * n > s
        keep = pc.greater(pc.multiply(cents, n_pos), s_pos)
        t = t.append_column("bal_cents", cents).filter(keep)
        return t.select(["c_custkey", "c_nationkey", "bal_cents"])

    cust = clean_blocks(
        _read(
            sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
        ).map_batches(above_avg, batch_format="pyarrow"),
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
                ("bal_cents", pa.int64()),
            ]
        ),
    )
    def urgent_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], priority))
        return t.select(["o_custkey"]).group_by("o_custkey").aggregate([])

    probe = clean_blocks(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            urgent_keys, batch_format="pyarrow"
        ),
        _KEY_SCHEMA,
    )
    inactive = cust.join(
        probe,
        join_type="left_anti",
        num_partitions=join_parts(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "c_nationkey": t["c_nationkey"],
                    "n_cust": pa.array(np.ones(t.num_rows, np.int64)),
                    "total_bal_cents": t["bal_cents"],
                }
            )
            .group_by("c_nationkey")
            .aggregate([("n_cust", "sum"), ("total_bal_cents", "sum")])
        )
        return g.rename_columns(["c_nationkey", "n_cust", "total_bal_cents"])

    return (
        inactive.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("n_cust", alias_name="n_cust"),
            Sum("total_bal_cents", alias_name="total_bal_cents"),
        )
    )


def suppliers_sole_returns(sf_dir: str, k: int = 10) -> rd.Dataset:
    """(l_suppkey, n_orders): top-k suppliers that were the ONLY supplier
    with a returned ('R') line on a multi-supplier order — the TPC-H Q21
    shape: a correlated EXISTS (another supplier shipped the order) plus a
    correlated NOT EXISTS (no other supplier had a return) resolved as one
    self-grouping of lineitem.

    Scale shape: per-batch partial reduction to distinct
    (orderkey, suppkey, any_R) triples BEFORE the one orderkey-colocating
    shuffle (the only all-to-all); orders resolve inside coarse orderkey
    partitions with pandas' C groupby (never a per-order UDF dispatch);
    the supplier tally pre-aggregates per batch and the final sort/limit
    runs over the supplier domain."""
    # next power of two >= 4x the join width (bit_wise_and needs 2^k)
    parts = 1 << (join_parts() * 4 - 1).bit_length()

    def pair_partial(t: pa.Table) -> pa.Table:
        has_r = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        g = (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": t["l_suppkey"],
                    "has_r": has_r,
                }
            )
            .group_by(["l_orderkey", "l_suppkey"])
            .aggregate([("has_r", "max")])
        )
        g = g.rename_columns(["l_orderkey", "l_suppkey", "has_r"])
        part = pc.cast(
            pc.bit_wise_and(g["l_orderkey"], parts - 1), pa.int32()
        )
        return g.append_column("opart", part)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        a = (
            g.groupby(["l_orderkey", "l_suppkey"], sort=False)["has_r"]
            .max()
            .reset_index()
        )
        per_o = a.groupby("l_orderkey", sort=False)["has_r"].agg(
            n_supp="size", n_r="sum"
        )
        ok = per_o.index[(per_o["n_supp"] >= 2) & (per_o["n_r"] == 1)]
        w = a[a["l_orderkey"].isin(ok) & (a["has_r"] == 1)]
        out = w.groupby("l_suppkey", sort=False).size().reset_index(name="n")
        out["l_suppkey"] = out["l_suppkey"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["l_suppkey", "n"]]

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("opart")
        .map_groups(per_partition, batch_format="pandas")
        .groupby("l_suppkey")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["l_suppkey", "n_orders"]),
            batch_format="pyarrow",
        )
        .sort(["n_orders", "l_suppkey"], descending=[True, False])
        .limit(k)
    )


def supplier_top_revenue(sf_dir: str) -> rd.Dataset:
    """(s_suppkey, s_name, revenue_ccents): every supplier whose total
    discounted lineitem revenue equals the GLOBAL maximum — the TPC-H Q15
    shape: an aggregate view, a scalar max over it, and an equality
    join-back that keeps ties. Revenue is exact-integer "centi-cents":
    price_cents * (100 - discount_pct).

    Scale shape: per-batch partial sums shrink the shuffle to one row per
    (batch, suppkey) before the supplier-domain groupby; the aggregated
    view is bounded by the supplier domain, so materializing it for the
    two bounded consumers (scalar max + equality filter) is O(suppliers),
    never O(lineitem); supplier names arrive via the broadcast-dim
    ``_DimIndex`` probe, not a shuffle join."""
    import pyarrow.parquet as pq

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), disc),
        )
        g = (
            pa.table({"l_suppkey": t["l_suppkey"], "revenue_ccents": rev})
            .group_by("l_suppkey")
            .aggregate([("revenue_ccents", "sum")])
        )
        return g.rename_columns(["l_suppkey", "revenue_ccents"])

    per_supp = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("revenue_ccents", alias_name="revenue_ccents"))
        .materialize()  # bounded by the supplier domain
    )
    best = per_supp.max("revenue_ccents")

    supp = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey", "s_name"]
    )
    lookup_ref = ray.put(
        (supp["s_suppkey"].combine_chunks(), supp["s_name"].combine_chunks())
    )

    class Name:
        def __init__(self):
            keys, self.names = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)

        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["revenue_ccents"], best))
            idx = self.idx.lookup(t["l_suppkey"])
            return pa.table(
                {
                    "s_suppkey": t["l_suppkey"],
                    "s_name": self.names.take(idx),
                    "revenue_ccents": t["revenue_ccents"],
                }
            )

    return per_supp.map_batches(
        Name, batch_format="pyarrow", concurrency=pool_size(), num_cpus=0.5
    )


def promo_revenue_share(sf_dir: str) -> rd.Dataset:
    """One row (promo_revenue_ccents, total_revenue_ccents,
    promo_share_4096): discounted revenue from PROMO-type parts vs all
    revenue — the TPC-H Q14 shape (conditional aggregate over a
    fact x dim join), with the ratio reported in integer 4096ths so the
    oracle comparison never touches floats.

    Scale shape: the partkey -> is-promo bit rides the object store once
    (``ray.put``) and probes via the per-actor ``_DimIndex``; each batch
    reduces to ONE partial row, the final aggregate is a single-row
    groupby — no shuffle wider than one row per batch."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    promo = pc.equal(part["p_type"], "PROMO")
    lookup_ref = ray.put(
        (
            part["p_partkey"].combine_chunks(),
            pc.cast(promo, pa.int64()).combine_chunks(),
        )
    )

    class Share:
        def __init__(self):
            keys, self.bits = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)

        def __call__(self, t: pa.Table) -> pa.Table:
            disc = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
            )
            rev = pc.multiply(
                _cents(t["l_extendedprice"]),
                pc.subtract(pa.scalar(100, pa.int64()), disc),
            )
            bits = self.bits.take(self.idx.lookup(t["l_partkey"]))
            promo_rev = pc.sum(pc.multiply(rev, bits)).as_py() or 0
            total_rev = pc.sum(rev).as_py() or 0
            return pa.table(
                {
                    "one": pa.array([1], pa.int64()),
                    "promo_revenue_ccents": pa.array([promo_rev], pa.int64()),
                    "total_revenue_ccents": pa.array([total_rev], pa.int64()),
                }
            )

    def ratio(t: pa.Table) -> pa.Table:
        p = t["promo_revenue_ccents"]
        s = t["total_revenue_ccents"]
        share = pc.if_else(
            pc.greater(s, 0),
            pc.divide(pc.multiply(p, 4096), pc.max_element_wise(s, 1)),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "promo_revenue_ccents": p,
                "total_revenue_ccents": s,
                "promo_share_4096": share,
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(Share, batch_format="pyarrow",
                     concurrency=pool_size(), num_cpus=1)
        .groupby("one")
        .aggregate(
            Sum("promo_revenue_ccents", alias_name="promo_revenue_ccents"),
            Sum("total_revenue_ccents", alias_name="total_revenue_ccents"),
        )
        .map_batches(
            lambda t: ratio(t.drop_columns(["one"])), batch_format="pyarrow"
        )
    )


def part_cheapest_supplier(sf_dir: str) -> rd.Dataset:
    """(l_partkey, best_suppkey, cost_ccents): for every part, the
    supplier with the LOWEST total discounted lineitem spend on it
    (tiebreak: smallest suppkey) — the TPC-H Q2 min-cost-supplier shape
    as an argmin-per-group join-back, resolved without any correlated
    probe.

    Scale shape: per-batch partial (partkey, suppkey) sums shrink the
    ONE partkey-colocating shuffle; the argmin resolves inside coarse
    partkey partitions with pandas' C groupby idxmin (a lexsort-free
    two-key min via sort_values on the bounded per-partition frame) —
    partition width is the session knob, never the corpus."""
    parts = 1 << (join_parts() * 4 - 1).bit_length()

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        cost = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), disc),
        )
        g = (
            pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "l_suppkey": t["l_suppkey"],
                    "cost_ccents": cost,
                }
            )
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([("cost_ccents", "sum")])
        )
        g = g.rename_columns(["l_partkey", "l_suppkey", "cost_ccents"])
        ppart = pc.cast(pc.bit_wise_and(g["l_partkey"], parts - 1), pa.int32())
        return g.append_column("ppart", ppart)

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        a = (
            g.groupby(["l_partkey", "l_suppkey"], sort=False)["cost_ccents"]
            .sum()
            .reset_index()
        )
        a = a.sort_values(
            ["l_partkey", "cost_ccents", "l_suppkey"], kind="mergesort"
        )
        w = a.drop_duplicates("l_partkey", keep="first")
        return pd.DataFrame(
            {
                "l_partkey": w["l_partkey"].to_numpy(np.int64),
                "best_suppkey": w["l_suppkey"].to_numpy(np.int64),
                "cost_ccents": w["cost_ccents"].to_numpy(np.int64),
            }
        )

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(argmin, batch_format="pandas")
    )


def events_mode_type(sf_dir: str) -> rd.Dataset:
    """(user_id, mode_type, n): each user's most frequent event type,
    deterministic under count ties (lexicographically smallest type wins)
    — the per-group MODE aggregate, the categorical twin of the exact
    per-group quantiles.

    Scale shape: per-batch (user, type) partial counts bound the ONE
    user-colocating shuffle at (batch x users x |event types|) rows; the
    argmax resolves inside coarse ``RAYCRAWL_UPART`` partitions with one
    vectorized sort + drop_duplicates pass."""

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "event_type": t["event_type"],
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([("n", "sum")])
        )
        g = g.rename_columns(["user_id", "event_type", "n"])
        return _add_upart(g)

    def mode(g: pd.DataFrame) -> pd.DataFrame:
        a = (
            g.groupby(["user_id", "event_type"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        a = a.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        w = a.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": w["user_id"].to_numpy(np.int64),
                "mode_type": w["event_type"].to_numpy(),
                "n": w["n"].to_numpy(np.int64),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(mode, batch_format="pandas")
    )


def events_wau(sf_dir: str, window_days: int = 7) -> rd.Dataset:
    """(day, wau): trailing-``window_days`` active users for every day
    index that closes a window containing at least one event — the
    rolling COUNT(DISTINCT) every engagement dashboard runs, which no
    plain windowed aggregate expresses (distinct doesn't decompose over
    sliding frames).

    Scale shape: ONE user-colocating shuffle. Per batch: dedup to
    (user, day) pairs. Inside each coarse user partition: dedup again,
    explode each pair to the ``window_days`` window-END days it
    contributes to (numpy repeat+tile — users are colocated, so the
    (user, end-day) dedup is exact in-partition), then reduce to
    per-day partial counts bounded by the DAY DOMAIN. The final groupby
    sums disjoint user-partition partials — exact because partitions
    partition users."""
    us_per_day = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), us_per_day)
        g = (
            pa.table({"user_id": t["user_id"], "day": day})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        return _add_upart(g)

    def window_counts(g: pd.DataFrame) -> pd.DataFrame:
        a = g.drop_duplicates(["user_id", "day"])
        users = a["user_id"].to_numpy(np.int64)
        days = a["day"].to_numpy(np.int64)
        end_days = np.repeat(days, window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(days)
        )
        pairs = pd.DataFrame(
            {"user_id": np.repeat(users, window_days), "day": end_days}
        ).drop_duplicates()
        out = pairs.groupby("day", sort=False).size().reset_index(name="wau")
        out["day"] = out["day"].astype("int64")
        out["wau"] = out["wau"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(window_counts, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("wau", alias_name="wau"))
    )


def table_profile(sf_dir: str, table: str = "documents") -> pa.Table:
    """(col, n_nulls, n_distinct, lo, hi, total_len): per-column data
    profile of ``table`` — the ingest-time audit every pipeline run wants
    before trusting a new drop (null rates, key uniqueness, value ranges,
    payload volume). Integer columns report value min/max; string columns
    report BYTE-length min/max plus the total byte volume (so ``lo=hi``
    on a fixed-width key column or ``total_len`` doubling overnight are
    one-glance anomalies). Distinct counts are exact, null excluded (SQL
    COUNT(DISTINCT) semantics).

    Scale shape: ONE scan, ONE shuffle. Each batch emits two row kinds
    into the same stream: its locally-unique (col, val) rows (ints cast
    to string — bijective, counts unchanged) and one stats-partial row
    per column (nulls / min / max / byte volume). The coarse-hash
    partition resolves distincts with Arrow's binary-safe C dedup (the
    cost rule — distinct cardinality scales with the data) and routes
    the tiny stats rows through a reserved partition; both collapse into
    one final aggregate bounded by the COLUMN domain, because every
    measure is expressed in a shared (nd, n_nulls, lo, hi, total_len)
    frame where distinct rows carry identity elements for the stats and
    vice versa.
    """
    import pyarrow.parquet as pq

    from raycrawl.pipelines.dedup import coarse_key, coarse_parts
    from ray.data.aggregate import Max, Min, Sum

    schema = pq.read_schema(os.path.join(sf_dir, f"{table}.parquet"))
    cols = list(schema.names)
    kinds: dict[str, str] = {}
    for f in schema:
        if pa.types.is_integer(f.type):
            kinds[f.name] = "int"
        elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            kinds[f.name] = "str"
        else:
            raise NotImplementedError(
                f"table_profile supports int/string columns, got "
                f"{f.name}: {f.type}"
            )

    I64_MAX, I64_MIN = 2**63 - 1, -(2**63)
    mask = coarse_parts(sf_dir) - 1

    def melt(t: pa.Table) -> pa.Table:
        out_col, out_val, out_null = [], [], []
        out_lo, out_hi, out_len, n_us = [], [], [], []
        for c in cols:
            arr = t[c]
            valid = arr.drop_null()
            # distinct candidates: locally unique, stringified
            u = pc.unique(pc.cast(valid, pa.string()))
            n_u = len(u)
            n_us.append(n_u)
            out_col.extend([c] * n_u)
            out_val.append(u)
            out_null.extend([0] * n_u)
            out_lo.extend([I64_MAX] * n_u)
            out_hi.extend([I64_MIN] * n_u)
            out_len.extend([0] * n_u)
            # one stats-partial row per column
            if kinds[c] == "int":
                vals = pc.cast(valid, pa.int64())
                total = 0
            else:
                vals = pc.binary_length(valid)  # bytes = SQL strlen
                total = int(pc.sum(vals).as_py() or 0)
            mn, mx = pc.min(vals), pc.max(vals)
            out_col.append(c)
            out_val.append(pa.array([""], pa.string()))
            out_null.append(int(arr.null_count))
            out_lo.append(I64_MAX if mn.as_py() is None else int(mn.as_py()))
            out_hi.append(I64_MIN if mx.as_py() is None else int(mx.as_py()))
            out_len.append(total)
        tbl = pa.table(
            {
                "col": pa.array(out_col, pa.string()),
                "val": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_val]
                ),
                "n_nulls": pa.array(out_null, pa.int64()),
                "lo": pa.array(out_lo, pa.int64()),
                "hi": pa.array(out_hi, pa.int64()),
                "total_len": pa.array(out_len, pa.int64()),
            }
        )
        # stats rows go to the reserved partition -1; distinct rows hash
        # on (col, val)
        is_stats = np.zeros(len(tbl), bool)
        pos = 0
        for n_u in n_us:
            pos += n_u
            is_stats[pos] = True
            pos += 1
        pp = coarse_key(tbl.select(["col", "val"]).to_pandas(),
                        ["col", "val"], mask)
        pp[is_stats] = -1
        return tbl.append_column("pp", pa.array(pp, pa.int64()))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        if int(g["pp"].iloc[0]) == -1:
            agg = g.groupby("col", sort=False).agg(
                n_nulls=("n_nulls", "sum"), lo=("lo", "min"),
                hi=("hi", "max"), total_len=("total_len", "sum"),
            ).reset_index()
            agg["nd"] = 0
            return agg[["col", "nd", "n_nulls", "lo", "hi", "total_len"]]
        t = pa.Table.from_pandas(g[["col", "val"]], preserve_index=False)
        dd = t.group_by(["col", "val"]).aggregate([])  # binary-safe dedup
        cnt = dd.group_by("col").aggregate([([], "count_all")])
        out = cnt.rename_columns(["col", "nd"]).to_pandas()
        out["n_nulls"] = 0
        out["total_len"] = 0
        out["lo"] = I64_MAX
        out["hi"] = I64_MIN
        return out[["col", "nd", "n_nulls", "lo", "hi", "total_len"]]

    rows = (
        _read(sf_dir, table, cols)
        .map_batches(melt, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(resolve, batch_format="pandas")
        .groupby("col")
        .aggregate(
            Sum("nd", alias_name="n_distinct"),
            Sum("n_nulls", alias_name="n_nulls"),
            Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"),
            Sum("total_len", alias_name="total_len"),
        )
        .take_all()  # bounded by the column domain
    )
    by_col = {r["col"]: r for r in rows}
    order = sorted(cols)
    return pa.table(
        {
            "col": pa.array(order, pa.string()),
            "n_nulls": pa.array(
                [int(by_col[c]["n_nulls"]) for c in order], pa.int64()
            ),
            "n_distinct": pa.array(
                [int(by_col[c]["n_distinct"]) for c in order], pa.int64()
            ),
            "lo": pa.array([int(by_col[c]["lo"]) for c in order],
                           pa.int64()),
            "hi": pa.array([int(by_col[c]["hi"]) for c in order],
                           pa.int64()),
            "total_len": pa.array(
                [int(by_col[c]["total_len"]) for c in order], pa.int64()
            ),
        }
    )


def events_weekly_trend(sf_dir: str) -> pa.Table:
    """(week, event_type, n_events, wow_delta): weekly event counts per
    type with the week-over-week delta vs the previous OBSERVED week
    (LAG semantics — a type absent for a week compares to its last
    active week, exactly like the SQL window twin). The trend panel of
    every events dashboard.

    Scale shape: per-batch partial counts into a (week x type)-domain-
    bounded native aggregate; the LAG resolves on the driver over that
    domain-bounded table (weeks grow with the time span, never the row
    count). Week = epoch-us // 604800e6 — pure integer."""
    from ray.data.aggregate import Sum

    WEEK_US = 604_800_000_000

    def partial(t: pa.Table) -> pa.Table:
        wk = pc.divide(pc.cast(t["ts"], pa.int64()), WEEK_US)
        g = (
            pa.table({"week": wk, "event_type": t["event_type"]})
            .group_by(["week", "event_type"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["week", "event_type", "n"])

    rows = (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["week", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"))
        .take_all()  # bounded by the week x type domain
    )
    rows.sort(key=lambda r: (r["event_type"], r["week"]))
    weeks, types, ns, deltas = [], [], [], []
    prev_type, prev_n = None, 0
    for r in rows:
        if r["event_type"] != prev_type:
            prev_type, prev_n = r["event_type"], 0
        weeks.append(int(r["week"]))
        types.append(r["event_type"])
        ns.append(int(r["n_events"]))
        deltas.append(int(r["n_events"]) - prev_n)
        prev_n = int(r["n_events"])
    return pa.table(
        {
            "week": pa.array(weeks, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array(ns, pa.int64()),
            "wow_delta": pa.array(deltas, pa.int64()),
        }
    )


def events_conversion_lag(sf_dir: str, bucket_minutes: int = 60,
                          cap_buckets: int = 48) -> pa.Table:
    """(lag_bucket, n_users): distribution of each user's first-click ->
    first-purchase delay in ``bucket_minutes`` buckets (capped at
    ``cap_buckets``, the overflow bucket) — the conversion-latency
    histogram behind every funnel-timing dashboard. Users who purchase
    before ever clicking (or never do both) don't convert and are
    excluded, matching the SQL twin's join semantics.

    Scale shape: per-user MIN(ts) per side collapses per batch (one row
    per (batch, user, side)), resolves exactly inside coarse user
    partitions (user cardinality scales with the corpus — the cost
    rule), where the click/purchase pairing and bucketing also happen;
    the final aggregate is bounded by the BUCKET domain.
    """
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import coarse_key, coarse_parts

    mask = coarse_parts(sf_dir) - 1
    BUCKET_US = bucket_minutes * 60_000_000

    def partial(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.is_in(t["event_type"],
                     value_set=pa.array(["click", "purchase"]))
        )
        g = (
            pa.table(
                {
                    "user_id": keep["user_id"],
                    "event_type": keep["event_type"],
                    "ts_us": pc.cast(keep["ts"], pa.int64()),
                }
            )
            .group_by(["user_id", "event_type"])
            .aggregate([("ts_us", "min")])
        )
        g = g.rename_columns(["user_id", "event_type", "ts_us"])
        pp = coarse_key(g.select(["user_id"]).to_pandas(), ["user_id"],
                        mask)
        return g.append_column("pp", pa.array(pp, pa.int64()))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        first = (
            g.groupby(["user_id", "event_type"], sort=False)["ts_us"]
            .min()
            .unstack("event_type")
        )
        if "click" not in first or "purchase" not in first:
            return pd.DataFrame({"lag_bucket": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        conv = first.dropna(subset=["click", "purchase"])
        lag = conv["purchase"].astype("int64") - conv["click"].astype(
            "int64")
        lag = lag[lag >= 0]
        buckets = np.minimum(lag.to_numpy() // BUCKET_US, cap_buckets)
        c = np.bincount(buckets.astype(np.int64), minlength=1)
        nz = np.flatnonzero(c)
        return pd.DataFrame(
            {"lag_bucket": nz.astype(np.int64),
             "n": c[nz].astype(np.int64)}
        )

    rows = (
        _read(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(resolve, batch_format="pandas")
        .groupby("lag_bucket")
        .aggregate(Sum("n", alias_name="n_users"))
        .take_all()  # bounded by the bucket domain
    )
    rows.sort(key=lambda r: int(r["lag_bucket"]))
    return pa.table(
        {
            "lag_bucket": pa.array(
                [int(r["lag_bucket"]) for r in rows], pa.int64()),
            "n_users": pa.array(
                [int(r["n_users"]) for r in rows], pa.int64()),
        }
    )


def events_user_value_deciles(sf_dir: str, n_tiles: int = 10) -> pa.Table:
    """(decile, n_users, min_cents, max_cents, sum_cents): users ranked
    by lifetime purchase value and cut into NTILE(10) buckets (SQL NTILE
    semantics exactly: ordered by (total, user_id), the first n%10
    buckets one user larger) — the LTV decile table behind every
    retention/value segmentation.

    This is the distributed GLOBAL RANK primitive: per-user totals
    (coarse partitions — user cardinality scales), a range-partitioned
    ``Dataset.sort``, then each sorted block learns its global offset
    from an O(blocks) driver collect of block LENGTHS (never rows) and
    assigns rank = offset + arange and the closed-form NTILE bucket
    inside the block. The final aggregate is bounded by the tile domain.
    """
    import ray as _ray
    from ray.data.aggregate import Max, Min, Sum

    from raycrawl.pipelines.dedup import coarse_key, coarse_parts

    mask = coarse_parts(sf_dir) - 1

    def partial(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t["event_type"], "purchase"))
        g = (
            pa.table(
                {
                    "user_id": keep["user_id"],
                    "cents": _cents(keep["value"]),
                }
            )
            .group_by("user_id")
            .aggregate([("cents", "sum")])
        )
        g = g.rename_columns(["user_id", "total_cents"])
        pp = coarse_key(g.select(["user_id"]).to_pandas(), ["user_id"],
                        mask)
        return g.append_column("pp", pa.array(pp, pa.int64()))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("user_id", sort=False)["total_cents"]
            .sum()
            .reset_index()
        )
        out["total_cents"] = out["total_cents"].astype("int64")
        return out

    totals = (
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(resolve, batch_format="pandas")
        .sort(["total_cents", "user_id"])
        .materialize()
    )
    # ordered block refs -> per-block lengths (tiny tasks, rows stay put)
    refs = totals.to_arrow_refs()
    sizes = _ray.get(
        [_ray.remote(num_cpus=0.25)(lambda r: len(r)).remote(r)
         for r in refs]
    )
    offsets = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    n = int(sum(sizes))
    if n == 0:
        return pa.table(
            {"decile": pa.array([], pa.int64()),
             "n_users": pa.array([], pa.int64()),
             "min_cents": pa.array([], pa.int64()),
             "max_cents": pa.array([], pa.int64()),
             "sum_cents": pa.array([], pa.int64())}
        )
    base, rem = divmod(n, n_tiles)

    @_ray.remote(num_cpus=0.25)
    def tile_block(tbl, off: int) -> pa.Table:
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        if len(tbl) == 0:  # empty sorted blocks arrive SCHEMA-LESS
            return pa.table(
                {"decile": pa.array([], pa.int64()),
                 "total_cents": pa.array([], pa.int64())}
            )
        rank = off + np.arange(len(tbl), dtype=np.int64)
        if base == 0:
            tile = rank  # fewer users than tiles: one user per tile
        else:
            cut = rem * (base + 1)
            tile = np.where(
                rank < cut, rank // (base + 1),
                rem + (rank - cut) // base,
            )
        return pa.table(
            {
                "decile": pa.array(tile.astype(np.int64)),
                "total_cents": pc.cast(tbl["total_cents"], pa.int64()),
            }
        )

    tiled = rd.from_arrow_refs(
        [tile_block.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )
    rows = (
        tiled.groupby("decile")
        .aggregate(
            Sum("total_cents", alias_name="sum_cents"),
            Min("total_cents", alias_name="min_cents"),
            Max("total_cents", alias_name="max_cents"),
        )
        .take_all()  # bounded by the tile domain
    )
    counts = {int(r["decile"]): r for r in rows}
    order = sorted(counts)
    n_users = [
        (base + 1) if d < rem else base for d in order
    ] if base else [1] * len(order)
    return pa.table(
        {
            "decile": pa.array(order, pa.int64()),
            "n_users": pa.array(n_users, pa.int64()),
            "min_cents": pa.array(
                [int(counts[d]["min_cents"]) for d in order], pa.int64()),
            "max_cents": pa.array(
                [int(counts[d]["max_cents"]) for d in order], pa.int64()),
            "sum_cents": pa.array(
                [int(counts[d]["sum_cents"]) for d in order], pa.int64()),
        }
    )
