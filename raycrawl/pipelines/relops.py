"""Relational operator pipelines over the driver-provided tables.

The reference has no relational operators (SURVEY §2.6); these exist to
exercise the engine's groupby / join / sort / window machinery with exact
DuckDB oracles (every query here has an oracle_sql twin — column names and
integer-only aggregates are deliberately mirrored; money sums use cents to
avoid float-representation hash drift).

Patterns demonstrated: pruned reads (columns=...), per-batch partial
pre-aggregation before the shuffle, broadcast hash join (small side via
ray.put, no shuffle), top-k via sort+limit, sessionization via
groupby().map_groups over ts-sorted groups.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

__all__ = [
    "q1_returnflag_agg",
    "mktsegment_revenue",
    "orders_lineitem_join",
    "lineitem_topk",
    "events_window_agg",
    "events_sliding_agg",
    "events_sessionize",
    "events_topk_users",
    "events_asof_join",
    "events_range_join",
    "events_distinct_users",
    "events_gap_hist",
    "events_hll_users",
    "events_hll_by_type",
    "brand_revenue",
    "supplier_nation_balance",
    "region_nation_counts",
    "orders_price_quantiles",
    "orders_price_median",
    "orders_price_p90",
    "events_cms_counts",
    "q19_disjunctive_revenue",
]


def _read(sf_dir, name, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _cents(col):
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


class _DimIndex:
    """Integer-key -> position index for broadcast-join dims, built ONCE
    per actor.

    ``pc.index_in(probe, value_set=keys)`` re-hashes the whole value set on
    EVERY batch — the same failure class measured in fetchsim (37%
    throughput loss when the corpus doubled). Here the index is built once
    in ``Join.__init__``: a direct position array when the key range is
    dense (TPC-H keys are 1..N), else a sorted-array searchsorted probe —
    both O(batch) per batch with no per-batch hashing, and memory stays
    O(dim) either way.
    """

    def __init__(self, keys: pa.Array):
        k = np.asarray(keys.to_numpy(zero_copy_only=False), dtype=np.int64)
        self._n = len(k)
        if self._n == 0:
            self._direct = None
            self._sorted = np.empty(0, dtype=np.int64)
            self._order = np.empty(0, dtype=np.int64)
            return
        lo, hi = int(k.min()), int(k.max())
        if hi - lo + 1 <= max(4 * self._n, 1024):
            self._lo = lo
            self._direct = np.full(hi - lo + 1, -1, dtype=np.int64)
            self._direct[k - lo] = np.arange(self._n)
        else:
            self._direct = None
            self._order = np.argsort(k, kind="stable")
            self._sorted = k[self._order]

    def lookup(self, probe) -> pa.Array:
        """Positions of ``probe`` values in the dim (null where missing) —
        feed straight into ``values.take``, matching ``pc.index_in``."""
        p = np.asarray(
            (probe.combine_chunks() if isinstance(probe, pa.ChunkedArray)
             else probe).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        if self._direct is not None:
            q = p - self._lo
            ok = (q >= 0) & (q < len(self._direct))
            idx = np.where(ok, self._direct[np.where(ok, q, 0)], -1)
        elif self._n:
            j = np.searchsorted(self._sorted, p)
            j_c = np.minimum(j, self._n - 1)
            ok = self._sorted[j_c] == p
            idx = np.where(ok, self._order[j_c], -1)
        else:
            idx = np.full(len(p), -1, dtype=np.int64)
        return pa.array(idx, pa.int64(), mask=idx < 0)


def q1_returnflag_agg(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-shaped: lineitem grouped by (returnflag, linestatus).

    Partial per-batch aggregation first: the shuffle moves one row per
    (batch, flag, status) instead of every lineitem.
    """

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price_cents", "sum"), ("qty", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n_items"]
        )

    return (
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n_items", alias_name="n_items"),
        )
    )


def mktsegment_revenue(sf_dir: str) -> rd.Dataset:
    """Broadcast hash join: orders x customer (small side via ray.put),
    then revenue by market segment. No shuffle join — the dimension table
    rides the object store once and each batch does a vectorized take."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    lookup_ref = ray.put(
        (cust["c_custkey"].combine_chunks(), cust["c_mktsegment"].combine_chunks())
    )

    class Join:
        def __init__(self):
            # one zero-copy object-store read per actor; the key->position
            # index is built HERE, once — never per batch (VERDICT r2 #5)
            keys, self.vals = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = self.idx.lookup(t["o_custkey"])
            return pa.table(
                {
                    "c_mktsegment": self.vals.take(idx),
                    "price_cents": _cents(t["o_totalprice"]),
                }
            )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        )
        return g.rename_columns(["c_mktsegment", "revenue_cents", "n_orders"])

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(Join, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


def orders_lineitem_join(sf_dir: str) -> rd.Dataset:
    """Large-x-large hash join: orders x lineitem via the NATIVE
    ``Dataset.join`` (hash-partitioned on the key — both sides shuffle),
    then revenue per order priority. Complements the broadcast join in
    mktsegment_revenue: this is the shape for two big fact tables."""

    def prep_li(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        prep_li, batch_format="pyarrow"
    )
    joined = orders.join(
        lineitem,
        join_type="inner",
        num_partitions=join_parts(),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        )
        return g.rename_columns(["o_orderpriority", "revenue_cents", "n_items"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_items", alias_name="n_items"),
        )
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wrapping uint64 arithmetic)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher); m is a power of two."""
    x = keys.astype(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) & np.uint64(m - 1)


def urgent_order_revenue(sf_dir: str, bloom_log2: int = 23,
                         k_hashes: int = 4) -> rd.Dataset:
    """Revenue + item count of lineitems on URGENT orders: a BLOOM-
    PREFILTERED hash join.

    The selective side (urgent orderkeys, ~20% of orders) is summarized as
    a Bloom filter and broadcast; the probe side (lineitem, the huge fact
    table) drops non-members BEFORE the shuffle join, so ~80% of its rows
    never enter the all-to-all exchange. This is the at-scale middle
    ground between mktsegment_revenue's exact broadcast index (needs the
    keys to fit worker heaps) and orders_lineitem_join's full two-sided
    shuffle: the bloom is bits/key, not bytes/key. False positives are
    harmless — the exact (now tiny) Dataset.join behind the filter drops
    them, so the result is exact and the shared SQL oracle proves it.

    Bloom construction is distributed: per-batch partial bit arrays, OR-
    reduced through a 64-way grouped shuffle (the HLL-register pattern),
    driver ORs <= 64 rows of 2^bloom_log2 bits. Size bloom_log2 to ~10
    bits per expected key for <1% FP at k=4."""
    m = 1 << bloom_log2
    words = m >> 6

    from raycrawl.pipelines.dedup import clean_blocks

    urgent_schema = pa.schema([("o_orderkey", pa.int64())])
    urgent = clean_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
            lambda t: pa.table(
                {"o_orderkey": t.filter(
                    pc.equal(t["o_orderpriority"], "1-URGENT")
                )["o_orderkey"]}
            ),
            batch_format="pyarrow",
        ),
        urgent_schema,
    )

    def partial_bloom(t: pa.Table) -> pa.Table:
        bits = np.zeros(words, np.uint64)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        if len(keys):
            pos = _bloom_positions(keys, m, k_hashes).ravel()
            np.bitwise_or.at(bits, pos >> np.uint64(6),
                             np.uint64(1) << (pos & np.uint64(63)))
        part = int(keys[0]) & 63 if len(keys) else 0
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "bits": pa.array([bits.tobytes()], pa.binary()),
            }
        )

    def or_group(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(words, np.uint64)
        for b in g["bits"]:
            acc |= np.frombuffer(b, np.uint64)
        return pd.DataFrame({"part": [g["part"].iloc[0]],
                             "bits": [acc.tobytes()]})

    reduced = (
        urgent.map_batches(partial_bloom, batch_format="pyarrow")
        .groupby("part")
        .map_groups(or_group, batch_format="pandas")
        .to_pandas()  # <= 64 rows of 2^bloom_log2 bits
    )
    bits = np.zeros(words, np.uint64)
    for b in reduced["bits"]:
        acc = np.frombuffer(memoryview(b), np.uint64)
        bits |= acc
    bits_ref = ray.put(bits)

    class Probe:
        """Prefilter stage: the bloom loads once per actor."""

        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
            if not len(keys):
                return pa.table(
                    {"l_orderkey": pa.array([], pa.int64()),
                     "price_cents": pa.array([], pa.int64())}
                )
            pos = _bloom_positions(keys, m, k_hashes)
            hit = np.ones(len(keys), bool)
            for i in range(k_hashes):
                hit &= (
                    (self.bits[pos[i] >> np.uint64(6)]
                     >> (pos[i] & np.uint64(63))) & np.uint64(1)
                ).astype(bool)
            kept = t.filter(pa.array(hit))
            return pa.table(
                {
                    "l_orderkey": kept["l_orderkey"],
                    "price_cents": _cents(kept["l_extendedprice"]),
                }
            )

    li_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("price_cents", pa.int64())])
    prefiltered = clean_blocks(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
            Probe, batch_format="pyarrow", concurrency=pool_size(),
            num_cpus=0.5,
        ),
        li_schema,
    )

    joined = prefiltered.join(
        urgent,
        join_type="inner",
        num_partitions=join_parts(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "one": pa.array([0], pa.int64()),
                "revenue_cents": pa.array(
                    [pc.sum(t["price_cents"]).as_py() or 0], pa.int64()
                ),
                "n_items": pa.array([t.num_rows], pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("one")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_items", alias_name="n_items"),
        )
        .select_columns(["revenue_cents", "n_items"])
    )


def lineitem_topk(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Top-k by extended price; deterministic tie-break on the key columns."""
    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    ds = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"]
    ).map_batches(prep, batch_format="pyarrow")
    return ds.sort(
        ["price_cents", "l_orderkey", "l_linenumber"],
        descending=[True, False, False],
    ).limit(k)


def events_window_agg(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windows per event_type: streaming-shaped aggregate
    expressed as a derived window key + grouped aggregate."""

    def prep(t: pa.Table) -> pa.Table:
        epoch = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        win = pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()), 3600.0)), pa.int64())
        return pa.table(
            {
                "event_type": t["event_type"],
                "win": win,
                "value_cents": _cents(t["value"]),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "win"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")]
        )
        return g.rename_columns(["event_type", "win", "total_cents", "n_events"])

    return (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "win"])
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_events", alias_name="n_events"),
        )
    )


def events_sliding_agg(sf_dir: str) -> rd.Dataset:
    """Sliding windows (1 h size, 30 min hop): each event lands in the two
    windows covering it — expressed as a per-batch EXPLODE to (event_type,
    window_start) rows, then the usual partial + grouped aggregation.
    window_start is in half-hour units since the epoch."""

    def prep(t: pa.Table) -> pa.Table:
        halfh = pc.cast(
            pc.divide(pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000), 1800),
            pa.int64(),
        )
        cents = _cents(t["value"])
        # explode: window starting at this half-hour and the previous one
        et = pa.concat_arrays([t["event_type"].combine_chunks()] * 2)
        win = pa.concat_arrays(
            [halfh.combine_chunks(),
             pc.subtract(halfh, 1).combine_chunks()]
        )
        val = pa.concat_arrays([cents.combine_chunks()] * 2)
        g = pa.table(
            {"event_type": et, "win_start": win, "value_cents": val}
        ).group_by(["event_type", "win_start"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")]
        )
        return g.rename_columns(
            ["event_type", "win_start", "total_cents", "n_events"]
        )

    return (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "win_start"])
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_events", alias_name="n_events"),
        )
    )


def _cluster_cpus(default: int = 16) -> int:
    """Cluster CPU count if a Ray session exists; never auto-inits."""
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


def join_parts() -> int:
    """Hash-join partition count: ~CPUs/2 (each partition is one
    aggregator's working set) unless RAYCRAWL_JOIN_PARTS pins it. On a
    256-node cluster this derives O(thousands) of partitions from the
    session instead of a laptop-sized constant."""
    env = os.environ.get("RAYCRAWL_JOIN_PARTS")
    return int(env) if env else max(8, _cluster_cpus() // 2)


def pool_size() -> int:
    """Actor-pool width for stateful map_batches stages: ~CPUs/8 (the
    pools share the cluster with the shuffle stages) unless RAYCRAWL_POOL
    pins it."""
    env = os.environ.get("RAYCRAWL_POOL")
    return int(env) if env else max(2, _cluster_cpus() // 8)


# Coarse-partition width for the per-user ops. Size it to ~4x the
# cluster's cores (RAYCRAWL_UPART, power of two): each partition is one
# map_groups task holding rows/NPARTS of the events table in a pandas
# frame, so more cores OR a bigger corpus per heap -> raise it. 64 suits
# the 32-CPU test box; a 256-node cluster would run 4096.
_UPART_N = int(os.environ.get("RAYCRAWL_UPART", "64"))
if _UPART_N & (_UPART_N - 1):
    raise ValueError(f"RAYCRAWL_UPART must be a power of two, got {_UPART_N}")


def _add_upart(t: pa.Table) -> pa.Table:
    """Coarse user partition key: a per-DISTINCT-user map_groups UDF costs
    ~0.15 ms of dispatch per group — ruinous at real user counts. Coarse
    partitions keep the shuffle user-colocated while pandas' C groupby
    resolves users inside each partition."""
    part = pc.cast(pc.bit_wise_and(t["user_id"], _UPART_N - 1), pa.int32())
    return t.append_column("upart", part)


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Per-user sessionization (gap > 30min splits a session): coarse
    64-way user partition, then ONE vectorized pass per partition — sort
    by (user, ts), per-user diff > gap counts session breaks. Ray Data
    groupby guarantees key-colocation, not order; ordering is established
    inside the partition."""
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["user_id", "ts"]].copy()
        g["ts"] = g["ts"].astype("int64")
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        brk = g.groupby("user_id")["ts"].diff().gt(gap_us)
        out = (
            g.assign(brk=brk)
            .groupby("user_id", as_index=False)
            .agg(n_breaks=("brk", "sum"), n_events=("ts", "count"))
        )
        out["n_sessions"] = out.pop("n_breaks").astype("int64") + 1
        return out[["user_id", "n_sessions", "n_events"]]

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(sessions, batch_format="pandas")
    )


def events_topk_users(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Top-k users by total event value: partial per-batch aggregation ->
    small groupby -> sort+limit. Deterministic tie-break on user_id."""

    def prep(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"user_id": t["user_id"], "value_cents": _cents(t["value"])}
        ).group_by("user_id").aggregate([("value_cents", "sum")])
        return g.rename_columns(["user_id", "total_cents"])

    return (
        _read(sf_dir, "events", ["user_id", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("total_cents", alias_name="total_cents"))
        .sort(["total_cents", "user_id"], descending=[True, False])
        .limit(k)
    )


def _ts_bounds(sf_dir: str) -> tuple:
    """(min_us, max_us) of events.ts from Parquet row-group statistics
    (O(row-groups), no scan); falls back to a distributed min/max scan when
    a writer left no stats."""
    import pyarrow.parquet as pq_

    f = pq_.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    idx = f.schema_arrow.get_field_index("ts")
    mins, maxs = [], []
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            mins = []
            break
        mins.append(st.min)
        maxs.append(st.max)
    if mins:
        lo, hi = min(mins), max(maxs)
    else:
        ds = _read(sf_dir, "events", ["ts"])
        lo, hi = ds.min("ts"), ds.max("ts")
    to_us = (
        lambda v: int(v)
        if isinstance(v, (int, np.integer))
        else pd.Timestamp(v).value // 1000
    )
    return to_us(lo), to_us(hi)


def events_asof_join(sf_dir: str, salt_slices: int | None = None) -> rd.Dataset:
    """AS-OF join (backward): each click event matched to the same user's
    most recent purchase at-or-before it.

    Ray Data has no native as-of join; the composition is the documented
    pattern for order-dependent joins: partition by the equality key
    (user_id — ONE shuffle moves only the two event slices), then a sorted
    merge inside each group (numpy searchsorted — vectorized, O(n log n)
    per group). Purchases are pre-deduped per (user, ts) with MAX(cents) so
    ties resolve deterministically on both engines. Partitioning
    assumption: one user's events fit one group — true for event data.

    ``salt_slices=S`` is the SKEW-SAFE path for pathological key
    distributions (one user owning most of the table): each partition key
    becomes (user, ts-range slice of S), so a hot user's rows spread over S
    tasks. Correctness across slice boundaries comes from a small
    purchases-only pre-pass that replicates each (user, slice)'s LAST
    purchase into every later slice as a carry candidate (<= S-1 rows per
    user-slice — the candidate max over carries equals the true latest
    earlier purchase). Both paths emit identical rows (oracle-checked);
    leave salting off when keys are well-spread — the boundary pre-pass is
    an extra purchases shuffle.
    """

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        t = t.filter(mask)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "is_purchase": pc.equal(t["event_type"], "purchase"),
                "value_cents": _cents(t["value"]),
            }
        )

    _EMPTY = {
        "user_id": pd.array([], "int64"),
        "click_ts_us": pd.array([], "int64"),
        "purchase_ts_us": pd.array([], "int64"),
        "purchase_cents": pd.array([], "int64"),
    }

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        # one coarse partition holds many users: pandas C groupby finds the
        # per-user runs, numpy searchsorted merges each (the inner loop is
        # per USER, never per row or per Ray task)
        outs = [pd.DataFrame(_EMPTY)]
        for _, u in g.groupby("user_id", sort=False):
            p = u[u["is_purchase"]]
            c = u[~u["is_purchase"]]
            if p.empty or c.empty:
                continue
            pp = (
                p.groupby("ts_us", as_index=False)["value_cents"].max()
                .sort_values("ts_us")
            )
            pts = pp["ts_us"].to_numpy()
            pcents = pp["value_cents"].to_numpy()
            cts = np.sort(c["ts_us"].to_numpy())
            idx = np.searchsorted(pts, cts, side="right") - 1
            ok = idx >= 0
            n = int(ok.sum())
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(n, u["user_id"].iloc[0],
                                           dtype=np.int64),
                        "click_ts_us": cts[ok],
                        "purchase_ts_us": pts[idx[ok]],
                        "purchase_cents": pcents[idx[ok]],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    if not salt_slices or salt_slices <= 1:
        return (
            ev.map_batches(_add_upart, batch_format="pyarrow")
            .groupby("upart")
            .map_groups(asof, batch_format="pandas")
        )

    # ---- ts-range-salted path ----
    from raycrawl.pipelines.dedup import clean_blocks

    S = int(salt_slices)
    lo, hi = _ts_bounds(sf_dir)
    span = max(hi - lo + 1, 1)
    part_schema = pa.schema(
        [("user_id", pa.int64()), ("ts_us", pa.int64()),
         ("is_purchase", pa.bool_()), ("value_cents", pa.int64()),
         ("kpart", pa.int64())]
    )

    def add_kpart(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        sl = (ts - lo) * S // span  # in [0, S-1] by construction
        up = t["user_id"].to_numpy(zero_copy_only=False) & (_UPART_N - 1)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts_us"],
                "is_purchase": t["is_purchase"],
                "value_cents": t["value_cents"],
                "kpart": pa.array(up * S + sl, pa.int64()),
            }
        )

    keyed = ev.map_batches(add_kpart, batch_format="pyarrow")

    _B_EMPTY = {
        "user_id": pd.array([], "int64"),
        "ts_us": pd.array([], "int64"),
        "is_purchase": pd.array([], "boolean"),
        "value_cents": pd.array([], "int64"),
        "kpart": pd.array([], "int64"),
    }

    def boundaries(g: pd.DataFrame) -> pd.DataFrame:
        # one (upart, slice) partition of PURCHASES: per user, the last
        # purchase (max ts; MAX cents at that ts — the asof dedup rule),
        # replicated into every later slice as a carry candidate
        sl = int(g["kpart"].iloc[0]) % S
        if sl >= S - 1:
            return pd.DataFrame(_B_EMPTY)
        dd = g.groupby(["user_id", "ts_us"], as_index=False)["value_cents"].max()
        last = dd.sort_values("ts_us").groupby("user_id", as_index=False).tail(1)
        reps = []
        for k in range(sl + 1, S):
            r = last.copy()
            r["kpart"] = (r["user_id"].to_numpy() & (_UPART_N - 1)) * S + k
            reps.append(r)
        out = pd.concat(reps, ignore_index=True)
        out["is_purchase"] = True
        return out[["user_id", "ts_us", "is_purchase", "value_cents", "kpart"]]

    carries = clean_blocks(
        keyed.map_batches(
            lambda t: t.filter(t["is_purchase"]), batch_format="pyarrow"
        )
        .groupby("kpart")
        .map_groups(boundaries, batch_format="pandas"),
        part_schema,
    )
    return (
        clean_blocks(keyed, part_schema)
        .union(carries)
        .groupby("kpart")
        .map_groups(asof, batch_format="pandas")
    )


def brand_revenue(sf_dir: str) -> rd.Dataset:
    """Revenue by part brand: lineitem x part broadcast join (the dim
    table rides the object store once as an Arrow array pair; vectorized
    index_in+take probe), partial pre-agg before the final groupby."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    lookup_ref = ray.put(
        (part["p_partkey"].combine_chunks(), part["p_brand"].combine_chunks())
    )

    class Join:
        def __init__(self):
            keys, self.vals = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)  # built once per actor, not per batch

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = self.idx.lookup(t["l_partkey"])
            g = pa.table(
                {
                    "p_brand": self.vals.take(idx),
                    "price_cents": _cents(t["l_extendedprice"]),
                }
            ).group_by("p_brand").aggregate(
                [("price_cents", "sum"), ("price_cents", "count")]
            )
            return g.rename_columns(["p_brand", "revenue_cents", "n_items"])

    return (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        .map_batches(Join, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1)
        .groupby("p_brand")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_items", alias_name="n_items"),
        )
    )


def supplier_nation_balance(sf_dir: str) -> rd.Dataset:
    """Account-balance totals per supplier nation: supplier x nation
    broadcast join + grouped integer aggregate."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    lookup_ref = ray.put(
        (nation["n_nationkey"].combine_chunks(), nation["n_name"].combine_chunks())
    )

    class Join:
        def __init__(self):
            keys, self.vals = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)  # built once per actor, not per batch

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = self.idx.lookup(t["s_nationkey"])
            g = pa.table(
                {
                    "n_name": self.vals.take(idx),
                    "bal_cents": _cents(t["s_acctbal"]),
                }
            ).group_by("n_name").aggregate(
                [("bal_cents", "sum"), ("bal_cents", "count")]
            )
            return g.rename_columns(["n_name", "total_bal_cents", "n_suppliers"])

    return (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(Join, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1)
        .groupby("n_name")
        .aggregate(
            Sum("total_bal_cents", alias_name="total_bal_cents"),
            Sum("n_suppliers", alias_name="n_suppliers"),
        )
    )


def events_distinct_users(sf_dir: str) -> rd.Dataset:
    """(event_type, n_users): COUNT-DISTINCT via two-level aggregation —
    the distributed distinct pattern (Ray Data has no distinct aggregate):
    per-batch local dedup shrinks the shuffle, the global dedup runs in
    coarse partitions (its output cardinality is users x types — the
    native-aggregate cost rule, BASELINE.md r4), then per-batch partial
    counts into a type-domain-bounded groupby."""
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import coarse_distinct, coarse_parts

    def local_dedup(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    def type_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "n_users"])

    return (
        coarse_distinct(
            _read(sf_dir, "events", ["event_type", "user_id"])
            .map_batches(local_dedup, batch_format="pyarrow"),
            ["event_type", "user_id"],
            coarse_parts(sf_dir) - 1,
        )
        .map_batches(type_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def events_hll_users(sf_dir: str, p: int = 14) -> pa.Table:
    """(n_users_hll,): global user cardinality via HyperLogLog — the sketch
    counterpart of :func:`events_distinct_users` for when the distinct key
    set itself is too large to shuffle (the exact version moves one row per
    distinct key; this moves 2^p bytes per BLOCK, full stop).

    Deterministic (splitmix-style integer hash, no RNG), so the result is
    stable run-to-run; the query wrapper asserts the estimate against the
    exact count at gate time. Merge is two-level so no single task ever
    sees more than max(64, blocks/64) register rows: per-batch registers →
    64-way salted groupby of elementwise maxima → driver max over ≤64 rows
    (16 KiB each). Standard small-range linear-counting correction applied.
    """
    m = 1 << p
    _MIX1 = 0x9E3779B97F4A7C15
    _MIX2 = 0xBF58476D1CE4E5B9
    _ADD = 0xD1B54A32D192ED03

    def registers(t: pa.Table) -> pa.Table:
        ids = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * np.uint64(_MIX1) + np.uint64(_ADD)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_MIX2)
        h ^= h >> np.uint64(32)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        # rho over the LOW 50 bits: exactly representable in float64, so
        # floor(log2) is exact and the leading-zero count is branch-free
        w = (h & np.uint64((1 << 50) - 1)).astype(np.float64)
        rho = np.where(w > 0, 50 - np.floor(np.log2(w)), 51).astype(np.int8)
        regs = np.zeros(m, np.int8)
        np.maximum.at(regs, idx, rho)
        salt = int(h[0] % np.uint64(64)) if len(h) else 0
        return pa.table(
            {
                "salt": pa.array([salt], pa.int64()),
                "regs": pa.array([regs], pa.list_(pa.int8(), m)),
            }
        )

    def merge_group(t: pa.Table) -> pa.Table:
        stacked = (
            t["regs"].combine_chunks().flatten().to_numpy().reshape(-1, m)
        )
        merged = np.maximum.reduce(stacked).astype(np.int8)
        return pa.table(
            {
                "salt": t["salt"][:1],
                "regs": pa.array([merged], pa.list_(pa.int8(), m)),
            }
        )

    rows = (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(registers, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(merge_group, batch_format="pyarrow")
        .take_all()  # bounded: <=64 rows of 2^p bytes
    )
    if rows:
        regs = np.maximum.reduce(
            [np.asarray(r["regs"], np.int8) for r in rows]
        ).astype(np.float64)
    else:
        regs = np.zeros(m, np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return pa.table({"n_users_hll": pa.array([int(round(est))], pa.int64())})


def events_hll_by_type(sf_dir: str, p: int = 12) -> pa.Table:
    """(event_type, n_users_hll): PER-GROUP HyperLogLog user cardinality —
    the grouped twin of :func:`events_hll_users` for dashboards that need a
    distinct count per segment without shuffling one row per distinct
    (group, key) pair (what :func:`events_distinct_users`, the exact twin,
    must move). Data moved: one 2^p-byte register row per (block, group)
    — bounded by the GROUP domain, never by user cardinality.

    Same deterministic splitmix hash and two-level merge as the global
    sketch; the only change is registers/merges keyed by event_type, and
    the driver finalize is bounded by types x 64 salted rows. The query
    wrapper asserts every group's estimate against its exact distinct
    count at gate time (no SQL oracle: DuckDB's approx sketch differs).
    """
    m = 1 << p
    _MIX1 = 0x9E3779B97F4A7C15
    _MIX2 = 0xBF58476D1CE4E5B9
    _ADD = 0xD1B54A32D192ED03

    def registers(t: pa.Table) -> pa.Table:
        ids = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * np.uint64(_MIX1) + np.uint64(_ADD)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_MIX2)
        h ^= h >> np.uint64(32)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = (h & np.uint64((1 << 50) - 1)).astype(np.float64)
        rho = np.where(w > 0, 50 - np.floor(np.log2(w)), 51).astype(np.int8)
        # one register row per DISTINCT type in this batch (type domain is
        # small; np.unique + per-type maximum.at keeps it one pass)
        types, inv = np.unique(
            t["event_type"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        regs = np.zeros((len(types), m), np.int8)
        np.maximum.at(regs, (inv, idx), rho)
        salt = int(h[0] % np.uint64(64)) if len(h) else 0
        return pa.table(
            {
                "event_type": pa.array(types.astype(object), pa.string()),
                "salt": pa.array([salt] * len(types), pa.int64()),
                "regs": pa.array(list(regs), pa.list_(pa.int8(), m)),
            }
        )

    def merge_group(t: pa.Table) -> pa.Table:
        stacked = (
            t["regs"].combine_chunks().flatten().to_numpy().reshape(-1, m)
        )
        merged = np.maximum.reduce(stacked).astype(np.int8)
        return pa.table(
            {
                "event_type": t["event_type"][:1],
                "salt": t["salt"][:1],
                "regs": pa.array([merged], pa.list_(pa.int8(), m)),
            }
        )

    rows = (
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(registers, batch_format="pyarrow")
        .groupby(["event_type", "salt"])
        .map_groups(merge_group, batch_format="pyarrow")
        .take_all()  # bounded: <= types x 64 rows of 2^p bytes
    )
    by_type: dict[str, np.ndarray] = {}
    for r in rows:
        regs = np.asarray(r["regs"], np.int8)
        key = r["event_type"]
        if key in by_type:
            np.maximum(by_type[key], regs, out=by_type[key])
        else:
            by_type[key] = regs.copy()
    alpha = 0.7213 / (1 + 1.079 / m)
    out_t, out_n = [], []
    for key in sorted(by_type):
        regs = by_type[key].astype(np.float64)
        est = alpha * m * m / np.sum(np.power(2.0, -regs))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out_t.append(key)
        out_n.append(int(round(est)))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "n_users_hll": pa.array(out_n, pa.int64()),
        }
    )


def events_range_join(sf_dir: str, window_s: int = 3600,
                      salt_slices: int | None = None) -> rd.Dataset:
    """RANGE join: each distinct click matched to the same user's purchases
    inside the preceding hour (ts in (click-1h, click]); emits count + sum.

    Same composition as events_asof_join (Ray Data has no native interval
    join): ONE shuffle partitions the two event slices by the equality key
    (user_id), then a sorted interval sweep per group — numpy searchsorted
    for both window edges + a prefix-sum for the windowed aggregate, so the
    per-group cost is O(n log n) regardless of window width (never the
    O(n*w) nested loop a naive range join degrades to).

    ``salt_slices=S`` is the skew-safe path (hot user): partition by
    (user, ts-range slice). The slice count is capped so every slice is at
    least one window wide, which makes boundary handling a pure stateless
    replication — a purchase within ``window_s`` of its slice's end is
    ALSO sent to the next slice (classic interval-fragment replication, no
    pre-pass shuffle at all). Each click lives in exactly one slice, so
    nothing double-counts; both paths emit identical rows (oracle-checked).
    """
    win_us = window_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        t = t.filter(mask)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "is_purchase": pc.equal(t["event_type"], "purchase"),
                "value_cents": _cents(t["value"]),
            }
        )

    _EMPTY = {
        "user_id": pd.array([], "int64"),
        "click_ts_us": pd.array([], "int64"),
        "n_purchases": pd.array([], "int64"),
        "purchase_cents_sum": pd.array([], "int64"),
    }

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        # coarse partition of many users; per-USER interval sweeps inside
        outs = [pd.DataFrame(_EMPTY)]
        for _, u in g.groupby("user_id", sort=False):
            p = u[u["is_purchase"]].sort_values("ts_us")
            cts = np.unique(u.loc[~u["is_purchase"], "ts_us"].to_numpy())
            if p.empty or len(cts) == 0:
                continue
            pts = p["ts_us"].to_numpy()
            cum = np.concatenate([[0], np.cumsum(p["value_cents"].to_numpy())])
            lo = np.searchsorted(pts, cts - win_us, side="right")
            hi = np.searchsorted(pts, cts, side="right")
            ok = hi > lo
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(int(ok.sum()), u["user_id"].iloc[0],
                                           dtype=np.int64),
                        "click_ts_us": cts[ok],
                        "n_purchases": (hi - lo)[ok],
                        "purchase_cents_sum": cum[hi[ok]] - cum[lo[ok]],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    if not salt_slices or salt_slices <= 1:
        return (
            ev.map_batches(_add_upart, batch_format="pyarrow")
            .groupby("upart")
            .map_groups(sweep, batch_format="pandas")
        )

    # ---- ts-range-salted path ----
    lo, hi = _ts_bounds(sf_dir)
    span = max(hi - lo + 1, 1)
    # every slice must be >= one window wide so a click's window reaches at
    # most one slice back (S=1 degrades gracefully to the unsalted layout)
    S = max(1, min(int(salt_slices), span // max(win_us, 1)))

    def add_kpart_replicate(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        isp = t["is_purchase"].to_numpy(zero_copy_only=False)
        cents = t["value_cents"].to_numpy(zero_copy_only=False)
        sl = (ts - lo) * S // span
        up = uid & (_UPART_N - 1)
        # replicate a purchase into the next slice when a click there could
        # still see it: ts + win reaches past the next slice's start
        nxt_start = lo + ((sl + 1) * span + S - 1) // S
        rep = isp & (sl < S - 1) & (ts + win_us > nxt_start)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([uid, uid[rep]]), pa.int64()),
                "ts_us": pa.array(np.concatenate([ts, ts[rep]]), pa.int64()),
                "is_purchase": pa.array(
                    np.concatenate([isp, isp[rep]]), pa.bool_()
                ),
                "value_cents": pa.array(
                    np.concatenate([cents, cents[rep]]), pa.int64()
                ),
                "kpart": pa.array(
                    np.concatenate([up * S + sl, (up * S + sl + 1)[rep]]),
                    pa.int64(),
                ),
            }
        )

    return (
        ev.map_batches(add_kpart_replicate, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(sweep, batch_format="pandas")
    )


def region_nation_counts(sf_dir: str) -> rd.Dataset:
    """Two-level broadcast join: customer -> nation -> region, counted by
    region name (dimension tables broadcast; no shuffle join)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    # compose nation->region->name ONCE (vectorized index_in+take), then
    # broadcast the (nationkey, region_name) Arrow array pair
    ridx = pc.index_in(nation["n_regionkey"], value_set=region["r_regionkey"].combine_chunks())
    lookup_ref = ray.put(
        (nation["n_nationkey"].combine_chunks(),
         region["r_name"].combine_chunks().take(ridx.combine_chunks()))
    )

    class Join:
        def __init__(self):
            keys, self.vals = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)  # built once per actor, not per batch

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = self.idx.lookup(t["c_nationkey"])
            return pa.table({"r_name": self.vals.take(idx)})

    return (
        _read(sf_dir, "customer", ["c_nationkey"])
        .map_batches(Join, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1)
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
    )


def orders_price_quantiles(sf_dir: str) -> rd.Dataset:
    """(o_orderpriority, p50_cents, p90_cents, n): exact per-group discrete
    quantiles of the order price — DuckDB ``quantile_disc`` semantics
    (sorted 0-based index ``ceil(q*n) - 1``).

    Scale shape: a HISTOGRAM aggregate, not a sort. Per batch, prices
    collapse to (group, cents) -> count partials; the shuffle then moves
    one row per DISTINCT (group, value) pair — bounded by the value
    domain, not the row count — and a per-group cumulative scan over the
    sorted histogram picks the quantile elements. An exact distributed
    quantile with no whole-column sort and no row-level shuffle; degrades
    gracefully (worst case = distinct-value count) when the domain is
    unbounded.
    """
    import math

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o_orderpriority": t["o_orderpriority"],
                    "cents": _cents(t["o_totalprice"]),
                }
            )
            .group_by(["o_orderpriority", "cents"])
            .aggregate([("cents", "count")])
        )
        return g.rename_columns(["o_orderpriority", "cents", "n"])

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        counts = g["n"].to_numpy()
        cents = g["cents"].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])

        def pick(q: float) -> int:
            # DuckDB quantile_disc: the ceil(q*n)-th smallest element
            # (verified against duckdb across n/q boundaries incl. the
            # q*n float-representation edges — the SAME float expression
            # runs on both sides)
            rank = math.ceil(q * n)
            return int(cents[np.searchsorted(cum, rank, side="left")])

        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                "p50_cents": [pick(0.5)],
                "p90_cents": [pick(0.9)],
                "n": [n],
            }
        )

    return (
        _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "cents"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("o_orderpriority")
        .map_groups(quant, batch_format="pandas")
    )


def events_quantile_sketch(sf_dir: str, samples_per_block: int = 256,
                           qs=(10, 50, 90, 99)) -> pa.Table:
    """(q_pct, approx_cents): mergeable uniform-compaction quantile sketch
    over the event value — the at-scale companion to the exact histogram
    quantiles (orders_price_quantiles), for value domains too wide for a
    distinct-value shuffle.

    Sketch: each block sorts its cents locally and keeps a fixed NUMBER of
    samples s (every k_b-th value, k_b = ceil(B/s), midpoint rule, weight
    k_b, plus one remainder sample). Per-block rank error is <= k_b/2 ~
    B/(2s), so the summed global error is <= n/(2s): a RELATIVE bound of
    1/(2s) (~0.2% at s=256) that is independent of corpus size and block
    count — a fixed stride k would instead degrade as blocks shrink (a
    small block would contribute only its median). Samples merge by
    concatenation; the bound is checked at query time by the driver
    wrapper (__ray_entry__._quantile_sketch_checked) against exact ranks.

    Scale shape: the shuffle moves <= s+1 weighted rows per block
    (deterministic, no value-domain assumption); the final weighted-rank
    scan runs on one worker over those s*nblocks samples (repartition(1)
    — at extreme block counts this tree-merges by re-compacting, same
    rule), and only the |qs| answer rows reach the driver."""
    s = samples_per_block

    def partial(t: pa.Table) -> pa.Table:
        v = np.sort(_cents(t["value"]).to_numpy(zero_copy_only=False))
        n = len(v)
        if n == 0:
            return pa.table({"cents": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.int64())})
        k = -(-n // s)  # ceil: fixed sample COUNT, scale-free error
        full = n // k
        idx = np.arange(full) * k + (k - 1) // 2
        w = np.full(full, k, dtype=np.int64)
        r = n - full * k
        if r:
            idx = np.append(idx, full * k + (r - 1) // 2)
            w = np.append(w, r)
        return pa.table({"cents": pa.array(v[idx], pa.int64()),
                         "weight": pa.array(w, pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("cents", "ascending")])
        v = t["cents"].take(order).to_numpy(zero_copy_only=False)
        w = t["weight"].take(order).to_numpy(zero_copy_only=False)
        cum = np.cumsum(w)
        total = cum[-1] if len(cum) else 0
        out_q, out_v = [], []
        for q in qs:
            target = max(1, int(np.ceil(q / 100.0 * total)))
            j = int(np.searchsorted(cum, target))
            out_q.append(int(q))
            out_v.append(int(v[min(j, len(v) - 1)]) if len(v) else 0)
        return pa.table({"q_pct": pa.array(out_q, pa.int64()),
                         "approx_cents": pa.array(out_v, pa.int64())})

    rows = (
        _read(sf_dir, "events", ["value"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
        .take_all()  # |qs| answer rows — the only driver materialization
    )
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("q_pct", pa.int64()),
                                ("approx_cents", pa.int64())])
    )


def events_cms_counts(
    sf_dir: str, k: int = 10, depth: int = 4, width: int = 2048
) -> pa.Table:
    """(user_id, n_events_cms): count-min-sketch event counts for the
    exact top-k users — the mergeable point-frequency sketch that
    complements :func:`events_hll_users` (cardinality) and the exact
    Misra-Gries heavy hitters: at 100 TB the per-key count table is too
    wide to shuffle, while the CMS moves ``depth x width`` int64s per
    BLOCK regardless of key cardinality.

    Deterministic (splitmix-style row hashes, no RNG). CMS merge is
    elementwise SUM (exactly mergeable), so the plan is the HLL one with
    sum instead of max: per-batch sketch -> 64-way salted groupby of
    elementwise sums -> driver sum over <=64 rows (64 KiB each). The
    candidate set probed at the end is the exact top-k (computed with the
    existing bounded plan); the query wrapper asserts the CMS guarantees
    vs the exact counts (est >= true always; overshoot <= 4N/width here).
    """
    m = depth * width
    _MIX2 = 0xBF58476D1CE4E5B9
    # distinct odd multiplier + offset per CMS row
    muls = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5][:depth], dtype=np.uint64,
    )
    adds = np.array(
        [0xD1B54A32D192ED03, 0x8CB92BA72F3D8DD7, 0xDB4F0B9175AE2165,
         0xA24BAED4963EE407][:depth], dtype=np.uint64,
    )

    def row_hashes(ids: np.ndarray) -> np.ndarray:
        """(depth, n) bucket indices."""
        h = ids[None, :] * muls[:, None] + adds[:, None]
        h ^= h >> np.uint64(29)
        h *= np.uint64(_MIX2)
        h ^= h >> np.uint64(32)
        return (h % np.uint64(width)).astype(np.int64)

    def sketch(t: pa.Table) -> pa.Table:
        ids = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = row_hashes(ids)
        cms = np.zeros((depth, width), np.int64)
        for d in range(depth):  # depth=4 iterations, each vectorized
            cms[d] = np.bincount(idx[d], minlength=width)
        salt = int(ids[0] % np.uint64(64)) if len(ids) else 0
        return pa.table(
            {
                "salt": pa.array([salt], pa.int64()),
                "cms": pa.array([cms.reshape(-1)], pa.list_(pa.int64(), m)),
            }
        )

    def merge_group(t: pa.Table) -> pa.Table:
        stacked = (
            t["cms"].combine_chunks().flatten().to_numpy().reshape(-1, m)
        )
        merged = stacked.sum(axis=0)
        return pa.table(
            {
                "salt": t["salt"][:1],
                "cms": pa.array([merged], pa.list_(pa.int64(), m)),
            }
        )

    rows = (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(sketch, batch_format="pyarrow")
        .groupby("salt")
        .map_groups(merge_group, batch_format="pyarrow")
        .take_all()  # bounded: <=64 rows of depth*width int64s
    )
    if rows:
        cms = np.sum(
            [np.asarray(r["cms"], np.int64) for r in rows], axis=0
        ).reshape(depth, width)
    else:
        cms = np.zeros((depth, width), np.int64)

    top = events_topk_users(sf_dir, k=k).take_all()  # bounded: k rows
    ids = np.array([r["user_id"] for r in top], dtype=np.uint64)
    if len(ids):
        idx = row_hashes(ids)
        est = cms[np.arange(depth)[:, None], idx].min(axis=0)
    else:
        est = np.zeros(0, np.int64)
    return pa.table(
        {
            "user_id": pa.array(ids.astype(np.int64), pa.int64()),
            "n_events_cms": pa.array(est, pa.int64()),
        }
    )


# Q19-shape disjunctive bands: (brand, size-range, quantity-range) triples.
# The predicate couples PART attributes and LINEITEM attributes per band —
# the textbook case where the filter can only resolve AFTER the join.
Q19_BANDS = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 1, 25, 10, 30),
    ("Brand#3", 1, 35, 20, 40),
)


def q19_disjunctive_revenue(sf_dir: str, bands: tuple = Q19_BANDS) -> rd.Dataset:
    """(revenue_ccents, n_items): TPC-H Q19 shape — discounted revenue
    over an OR-of-ANDs band predicate that couples part attributes
    (brand, size) with lineitem attributes (quantity) per band, so no
    single-side filter can resolve it.

    Plan: part is the small side — (partkey -> brand code, size) broadcast
    once via ``ray.put`` and indexed per actor (``_DimIndex``); each
    lineitem batch first PRE-PRUNES on the union of the bands' quantity
    ranges (the only pushdown that is valid before the join), then probes
    the dim and evaluates the disjunction as one vectorized numpy mask per
    band. Partials are one row per batch; revenue is exact integer
    centi-cents ``price_cents x (100 - disc_pct)`` (the mktsegment
    convention — no float ever aggregates)."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    brand_names = sorted({b for b, *_ in bands})
    brand_code = {b: i for i, b in enumerate(brand_names)}
    # dim payload: band-relevant brands as small ints (-1 = no band's brand)
    codes = np.array(
        [brand_code.get(b, -1) for b in part["p_brand"].to_pylist()],
        np.int64,
    )
    lookup_ref = ray.put(
        (
            part["p_partkey"].combine_chunks(),
            codes,
            part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    )
    qty_lo = min(b[3] for b in bands)
    qty_hi = max(b[4] for b in bands)

    class Probe:
        def __init__(self):
            keys, self.codes, self.sizes = ray.get(lookup_ref)
            self.idx = _DimIndex(keys)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            qty = pc.cast(t["l_quantity"], pa.int64())
            pre = pc.and_(
                pc.greater_equal(qty, qty_lo), pc.less_equal(qty, qty_hi)
            )
            t = t.filter(pre)  # union-of-bands pushdown before the probe
            if t.num_rows == 0:
                return pa.table(
                    {"one": pa.array([0], pa.int64()),
                     "revenue_ccents": pa.array([0], pa.int64()),
                     "n_items": pa.array([0], pa.int64())}
                )
            pos = self.idx.lookup(t["l_partkey"]).to_numpy(
                zero_copy_only=False)
            code = self.codes[pos]
            size = self.sizes[pos]
            q = pc.cast(t["l_quantity"], pa.int64()).to_numpy(
                zero_copy_only=False)
            keep = np.zeros(t.num_rows, bool)
            for brand, s_lo, s_hi, b_lo, b_hi in bands:
                keep |= (
                    (code == brand_code[brand])
                    & (size >= s_lo) & (size <= s_hi)
                    & (q >= b_lo) & (q <= b_hi)
                )
            price = _cents(t["l_extendedprice"]).to_numpy(
                zero_copy_only=False)
            disc = pc.cast(
                pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64()
            ).to_numpy(zero_copy_only=False)
            rev = int((price[keep] * (100 - disc[keep])).sum())
            return pa.table(
                {"one": pa.array([0], pa.int64()),
                 "revenue_ccents": pa.array([rev], pa.int64()),
                 "n_items": pa.array([int(keep.sum())], pa.int64())}
            )

    return (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(Probe, batch_format="pyarrow", concurrency=pool_size(),
                     num_cpus=0.5)
        .groupby("one")
        .aggregate(
            Sum("revenue_ccents", alias_name="revenue_ccents"),
            Sum("n_items", alias_name="n_items"),
        )
        .select_columns(["revenue_ccents", "n_items"])
    )


def events_gap_hist(sf_dir: str, cap_minutes: int = 240) -> rd.Dataset:
    """(gap_minutes, n_gaps): histogram of per-user inter-event gaps in
    whole minutes, capped at ``cap_minutes`` — the engagement-cadence
    report behind session-gap tuning (where does the 30-minute
    sessionization threshold actually sit in the distribution?).

    Same scale shape as sessionize: coarse user partitions, ONE
    vectorized pandas pass per partition (sort + per-user diff), per-
    partition bincount partials, then a gap-domain-bounded final groupby.
    Gaps are order-insensitive under ts ties (equal timestamps give zero
    gaps whatever the tie order), so no tiebreak column is needed."""
    from ray.data.aggregate import Sum

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        f = g[["user_id", "ts"]].copy()
        f["ts"] = f["ts"].astype("int64")  # epoch micros (timestamp[us])
        f = f.sort_values(["user_id", "ts"], kind="mergesort")
        d = f.groupby("user_id")["ts"].diff().dropna()
        m = np.minimum((d.to_numpy(np.int64) // 60_000_000), cap_minutes)
        vals, counts = np.unique(m, return_counts=True)
        return pd.DataFrame(
            {
                "gap_minutes": vals.astype("int64"),
                "n_gaps": counts.astype("int64"),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(_add_upart, batch_format="pyarrow")
        .groupby("upart")
        .map_groups(gaps, batch_format="pandas")
        .groupby("gap_minutes")
        .aggregate(Sum("n_gaps", alias_name="n_gaps"))
    )


def _orders_price_quantile(
    sf_dir: str, q_num: int, q_den: int, out_col: str
) -> rd.Dataset:
    """EXACT per-group discrete quantile of order price in cents, per
    priority — the element at 1-based rank ceil(q*n) (DuckDB's
    quantile_disc convention, probed for q in {0.25, 0.5, 0.9}). q is a
    rational q_num/q_den so the rank stays integer-exact.

    Scale shape: the group's values never assemble anywhere — per-batch
    (priority, cents) histogram partials merge through coarse partitions
    (distinct price values can scale with the corpus), then each
    priority's quantile is one cumulative-count pass over its
    histogram-compressed rows inside a domain-bounded map_groups (5
    priorities)."""
    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o_orderpriority": t["o_orderpriority"],
                    "cents": _cents(t["o_totalprice"]),
                    "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            )
            .group_by(["o_orderpriority", "cents"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["o_orderpriority", "cents", "n"])

    hist = coarse_sum(
        _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority", "cents"], ["n"], coarse_parts(sf_dir) - 1,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        total = int(g["n"].sum())
        rank = -(-q_num * total // q_den)  # ceil(q*n), integer-exact
        cum = g["n"].cumsum()
        v = int(g.loc[cum >= rank, "cents"].iloc[0])
        return pd.DataFrame(
            {
                "o_orderpriority": [g["o_orderpriority"].iloc[0]],
                out_col: pd.array([v], "int64"),
                "n_orders": pd.array([total], "int64"),
            }
        )

    return hist.groupby("o_orderpriority").map_groups(
        pick, batch_format="pandas"
    )


def orders_price_median(sf_dir: str) -> rd.Dataset:
    """(o_orderpriority, median_cents, n_orders): exact per-group lower
    median — see _orders_price_quantile."""
    return _orders_price_quantile(sf_dir, 1, 2, "median_cents")


def orders_price_p90(sf_dir: str) -> rd.Dataset:
    """(o_orderpriority, p90_cents, n_orders): exact per-group 90th
    percentile (discrete) — the tail-latency-style threshold report over
    the same histogram-compressed plan as the median (ONE more quantile
    costs nothing extra: same partials, different rank probe)."""
    return _orders_price_quantile(sf_dir, 9, 10, "p90_cents")
