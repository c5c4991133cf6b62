"""FrontierShard — the DUAL-KEYED frontier service actor.

Replaces the reference's driver-local crawl state (queue.Queue frontier,
``_seen_urls``/``_done_urls`` sets — /root/reference/simple_crawler/
crawler.py:81-83,159-163) with a pool of Ray actors where each actor plays
two roles under one shard id:

* role A — seen/done owner for the urls with ``hash(url_norm) % num_shards
  == id`` (``gate_round``). The url-hash key BALANCES under any host skew,
  which is what keeps a hot-host crawl's seen-gate parallel. Exact python
  set (conformance mode) or cuckoo filter (~2 B/url at scale,
  state/cuckoo.py).
* role B — politeness-queue owner for the hosts with ``shard_of_host(host)
  == id`` (``enqueue_round``/``release``): per-host heaps ordered by
  (depth, url_norm) — the deterministic total order this engine defines in
  place of the reference's hash-seed-dependent set-iteration order (SURVEY
  §4) — released under per-host budgets, per-host-serial but parallel
  across hosts (north_rule).

The done-set mirrors the reference's dequeue-time done check
(crawler.py:219-221), which only ever fires for re-discovered seeds; it is
applied in gate_round, where a url's done mark and seen entry live on the
same (url-hash) shard.

Checkpointing (north_rule: per-partition lineage): per-ROUND files named by
the driver manifest, both roles' state together; see ``checkpoint`` for the
crash-consistency contract. ``offer_buffer``/``commit_round`` are the
single-call legacy protocol kept for unit tests.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa
import ray

from raycrawl.state.cuckoo import CuckooFilter, url_hash64

__all__ = [
    "FrontierShard",
    "shard_of_host",
    "make_frontier_shards",
    "FRONTIER_SCHEMA",
]

FRONTIER_SCHEMA = pa.schema(
    [
        ("url_raw", pa.string()),
        ("url_norm", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
    ]
)


def hamilton_alloc(demand: dict, budget: int) -> dict:
    """Largest-remainder (Hamilton) split of ``budget`` slots across hosts
    proportionally to their demand — sum(alloc) == budget EXACTLY when
    demand is non-empty, every quantity an integer, deterministic ties
    (remainder DESC, host ASC). The same method (and tie rule) as the
    ``crawl_budget_alloc`` query (pipelines/crawlqueries.py) — this is its
    frontier-release twin, driving per-host quotas each round when
    ``politeness_budget="auto:N"``. Hosts may be allocated MORE than their
    demand when budget > total (release caps at available rows)."""
    import numpy as np

    hosts = sorted(demand)
    n = np.array([demand[h] for h in hosts], np.int64)
    total = int(n.sum())
    if total == 0 or budget <= 0:
        return {}
    quota = budget * n // total
    rem = budget * n % total
    r = budget - int(quota.sum())
    order = np.argsort(-rem, kind="stable")  # rem DESC, host ASC (stable)
    alloc = quota.copy()
    if r > 0:
        alloc[order[:r]] += 1
    return {h: int(a) for h, a in zip(hosts, alloc)}


@ray.remote(num_cpus=0)
def alloc_round_budgets(budget: int, *demands: dict) -> dict:
    """Chained allocation step between enqueue and release: merges the
    per-shard host-demand dicts (hosts are shard-owned, so disjoint) and
    returns the Hamilton allocation. num_cpus=0 — pure barrier-time work,
    like the shards themselves; runs without a driver round trip (the
    release takes the returned dict as a resolved ObjectRef arg)."""
    merged: dict = {}
    for d in demands:
        merged.update(d)
    return hamilton_alloc(merged, budget)


def shard_of_host(host: str, num_shards: int) -> int:
    return url_hash64("host:" + host) % num_shards


# num_cpus=0: a pure-barrier-time actor — shard work runs at the round
# BARRIER while the fetch pool is idle, but Ray subtracts any reserved
# actor CPUs from the map stage's task slots. At 0.25 x 4 shards a 4-CPU
# run lost a third of its fetch workers to idle reservations (measured:
# 2.2 effective workers of 4); even at 0.1 the combined infra actors
# (shards + robots + bucket store) still cost the 4-CPU leg one of its
# four 1-CPU task slots while costing the 16-CPU leg none — a measured
# asymmetry that distorts scaling readings. Zero reservation matches the
# truth: these actors burn CPU only while the fetch pool idles at the
# barrier. On a real multi-node cluster they'd also be a vanishing
# fraction of the fleet.
@ray.remote(num_cpus=0)
class FrontierShard:
    """One shard of the frontier service. All methods take/return plain
    python lists/dicts (cheap to serialize; row dicts stay columnar until
    the map_batches boundary)."""

    def __init__(self, shard_id: int, seen_mode: str = "exact",
                 cuckoo_capacity: int = 1 << 20, seed: int = 0):
        self.shard_id = shard_id
        self.seen_mode = seen_mode
        if seen_mode == "cuckoo":
            self._cuckoo = CuckooFilter(cuckoo_capacity, seed=seed + shard_id)
        elif seen_mode == "exact":
            self._seen: set = set()
        else:
            raise ValueError(f"unknown seen_mode {seen_mode!r}")
        self._done: set = set()
        # Arrow MIRRORS of _seen/_done for the vectorized gate probe
        # (round 5): the python sets stay authoritative for the per-url
        # slow paths; gate_round probes candidates with ONE pc.is_in
        # against these append-only chunk lists instead of to_pylist +
        # per-row set algebra (measured 2.8-4.0 µs/candidate). A slow
        # path that mutates the set without an array at hand just flips
        # the dirty flag; the next gate rebuilds the mirror once.
        self._seen_chunks: list = []
        self._seen_mirror_dirty = False
        self._done_chunks: list = []
        self._done_mirror_dirty = False
        # COLUMNAR pending state: a sorted leftover table plus unsorted
        # incoming appends, merged lazily at release time. Enqueue is an
        # O(1) table append and release is one vectorized sort + slice —
        # no per-row python in either direction (the per-row heappush/
        # heappop of the earlier design was the commit wall at scale).
        self._pending_tbl: pa.Table = FRONTIER_SCHEMA.empty_table()
        self._incoming: list = []
        self._pending_n = 0
        # urls enqueued via seed() — together with _dirty_done, the ONLY
        # urls that can ever be pending-while-done (everything else enters
        # pending exactly once, through the seen-gate, and is checked
        # against done there), so the dequeue-time done check
        # (crawler.py:219-221) only needs to consult these small sets
        self._seeded: set = set()
        # done marks arriving through the direct mark_done APIs (outside
        # the gate path, whose marks can only concern already-released
        # urls) — these CAN hit still-pending rows
        self._dirty_done: set = set()
        # candidates buffered within a round, committed at the round barrier
        self._buffer: list = []
        self.stats = {"seen_added": 0, "gate_dropped": 0, "released": 0,
                      "deferred_rounds": 0}

    # ---- seen-gate --------------------------------------------------------
    def _mirror(self, chunks: list, authoritative: set, dirty: bool):
        """The ChunkedArray mirror of a string set, rebuilt from the set
        when a slow path dirtied it; compacted when chunks pile up."""
        if dirty:
            chunks.clear()
            if authoritative:
                chunks.append(pa.array(sorted(authoritative), pa.string()))
        elif len(chunks) > 128:
            import pyarrow.compute as pc

            merged = pc.unique(pa.chunked_array(chunks))
            chunks.clear()
            chunks.append(merged)
        return pa.chunked_array(chunks) if chunks else None

    def _seen_check_add(self, url_norm: str) -> bool:
        """True if url was unseen (and is now marked seen)."""
        if self.seen_mode == "exact":
            if url_norm in self._seen:
                return False
            self._seen.add(url_norm)
            self._seen_mirror_dirty = True
            return True
        h = url_hash64(url_norm)
        if self._cuckoo.contains_hash(h):
            return False
        self._cuckoo.add_hash(h)
        return True

    def offer_buffer(self, rows: list) -> int:
        """Buffer candidate rows [(url_raw, url_norm, host, depth), ...]
        until the round barrier. Batches arrive in nondeterministic order
        during the round; determinism is restored at commit_round."""
        self._buffer.extend(rows)
        return len(self._buffer)

    def gate_round(self, cand_tbl, done_tbl, num_shards: int,
                   prebucketed: bool = False) -> pa.Table:
        """Round barrier phase A (balanced): seen-gate MY url-hash
        partition of the round's candidates.

        Every shard plays two roles with the same id: (1) seen/done owner
        for the urls whose ``hash(url_norm) % num_shards`` is its id — that
        partition BALANCES regardless of host skew — and (2) politeness
        queue owner for its hosts (phase B, enqueue_rows). The seen-gate is
        the expensive part; giving it the balanced key is what keeps a
        40%-hot-host crawl scaling.

        Tables arrive via the object store (zero-copy, same bytes for all
        shards). Returns the accepted (unseen, not-done) rows as an Arrow
        table — deterministic min-(depth,url_raw) representative per url,
        sorted by (depth, url_norm).
        """
        import time

        import pyarrow.compute as pc

        _t = time.perf_counter()
        _ph = {}

        def mine(tbl):
            # gshard was computed in the extract stage (distributed);
            # selecting my partition is one vectorized equality filter.
            # The gate_pieces path delivers tables split_stripe ALREADY
            # bucketed to this shard — re-filtering there copied the
            # whole string table for nothing (measured 2.5-4.4 s on the
            # 552k-candidate round, the largest single gate phase).
            if tbl is None or tbl.num_rows == 0:
                return None
            if prebucketed:
                return tbl
            sub = tbl.filter(pc.equal(tbl["gshard"], self.shard_id))
            return sub if sub.num_rows else None

        done_mine = mine(done_tbl)
        if done_mine is not None:
            self._done.update(done_mine["url_norm"].to_pylist())
            self._done_chunks.append(
                done_mine["url_norm"].combine_chunks()
            )

        cand_mine = mine(cand_tbl)
        if cand_mine is None:
            return FRONTIER_SCHEMA.empty_table()
        _ph["mine"] = time.perf_counter() - _t
        _t = time.perf_counter()

        # FILTER-FIRST: the seen/done predicate depends only on url_norm,
        # so every row of a norm survives or dies together — probe the gate
        # on the norm column and only sort/dedup the survivors. Round 5:
        # the exact path probes with ONE pc.is_in against the Arrow seen
        # mirror (C hash probe, no to_pylist of 2.2M candidates, no
        # per-row set algebra); only the ~12% fresh uniques ever become
        # Python strings (for the authoritative set).
        cand_norms = cand_mine["url_norm"]
        _ph["pylist"] = time.perf_counter() - _t
        _t = time.perf_counter()
        done_cs = self._mirror(
            self._done_chunks, self._done, self._done_mirror_dirty
        )
        self._done_mirror_dirty = False
        if self.seen_mode == "exact":
            seen_cs = self._mirror(
                self._seen_chunks, self._seen, self._seen_mirror_dirty
            )
            self._seen_mirror_dirty = False
            if seen_cs is not None:
                fresh_rows = pc.invert(
                    pc.is_in(cand_norms, value_set=seen_cs)
                )
            else:
                fresh_rows = pa.array(
                    np.ones(cand_mine.num_rows, bool))
            uniq_all = pc.count_distinct(cand_norms).as_py()
            fresh_uniq = pc.unique(cand_norms.filter(fresh_rows))
            if isinstance(fresh_uniq, pa.ChunkedArray):
                fresh_uniq = fresh_uniq.combine_chunks()
            self.stats["gate_dropped"] += uniq_all - len(fresh_uniq)
            self.stats["seen_added"] += len(fresh_uniq)
            if len(fresh_uniq):
                self._seen.update(fresh_uniq.to_pylist())
                self._seen_chunks.append(fresh_uniq)
            if done_cs is not None:
                keep = pc.and_(
                    fresh_rows,
                    pc.invert(pc.is_in(cand_norms, value_set=done_cs)),
                )
            else:
                keep = fresh_rows
        else:
            # vectorized batch probe+insert (state/cuckoo.py) — the mode
            # that exists for 1e10-url scale must not pay per-key python.
            # Probe UNIQUE hashes (ascending — deterministic insert order)
            # and fan the verdict back to rows via the inverse index so all
            # rows of a fresh norm survive to the representative pick.
            norm_list = cand_norms.to_pylist()
            hs = np.fromiter(
                (url_hash64(u) for u in norm_list), dtype=np.uint64,
                count=len(norm_list),
            )
            uh, inv = np.unique(hs, return_inverse=True)
            new_u = self._cuckoo.check_and_add_hashes(uh)
            n_new = int(new_u.sum())
            self.stats["seen_added"] += n_new
            self.stats["gate_dropped"] += len(uh) - n_new
            new_row = new_u[inv]
            if done_cs is not None and new_row.any():
                done_row = pc.is_in(
                    cand_norms, value_set=done_cs
                ).to_numpy(zero_copy_only=False)
                new_row &= ~done_row
            keep = pa.array(new_row)
        _ph["setops"] = time.perf_counter() - _t
        _t = time.perf_counter()
        sub = cand_mine.filter(keep)
        _ph["filter"] = time.perf_counter() - _t
        _t = time.perf_counter()

        # deterministic representative among the (few) survivors: sort by
        # (url_norm, depth, url_raw), keep the first row of each norm run
        idx = pc.sort_indices(
            sub,
            sort_keys=[("url_norm", "ascending"), ("depth", "ascending"),
                       ("url_raw", "ascending")],
        )
        sub = sub.take(idx)
        norms = sub["url_norm"].combine_chunks()
        if len(norms) > 1:
            prev = pa.concat_arrays(
                [pa.array([None], pa.string()), norms.slice(0, len(norms) - 1)]
            )
            sub = sub.filter(pc.fill_null(pc.not_equal(norms, prev), True))
        _ph["dedup"] = time.perf_counter() - _t
        _t = time.perf_counter()

        out = sub.select(["url_raw", "url_norm", "host", "depth"])
        # (depth, url_norm) ordering for deterministic enqueue downstream
        out = out.take(
            pc.sort_indices(
                out, sort_keys=[("depth", "ascending"), ("url_norm", "ascending")]
            )
        ).cast(FRONTIER_SCHEMA)
        _ph["outsort"] = time.perf_counter() - _t
        if os.environ.get("RAYCRAWL_TIMING") == "1" and self.shard_id == 0 \
                and sum(_ph.values()) > 2:
            print("[gate-phases s0] "
                  + " ".join(f"{k} {v:.2f}s" for k, v in _ph.items()),
                  flush=True)
        return out

    def split_stripe(self, block_refs, num_shards: int) -> dict:
        """Round-commit wave 1: kind-split MY STRIPE of the round's raw
        tall blocks and bucket the cand/done rows by gshard.

        The driver hands each shard a disjoint slice of block refs, so
        every block is scanned exactly ONCE cluster-wide (a dedicated task
        wave for this measured 1.6-4 s/round in pure Ray dispatch overhead
        for ~0.3 s of CPU; an every-shard-scans-everything design costs
        num_shards x the scan and starves small machines). Per-gshard
        pieces go back via the object store — the return value is a dict
        of small refs; edge rows never leave plasma and the driver never
        holds a round row. Kind counts for the driver's metrics accumulate
        here (last_kind_counts)."""
        import time

        import pyarrow.compute as pc

        t0 = time.perf_counter()
        counts: dict = {}
        cand_parts: dict = {g: [] for g in range(num_shards)}
        done_parts: dict = {g: [] for g in range(num_shards)}
        blocks = ray.get(list(block_refs))
        t_fetch = time.perf_counter() - t0
        for t in blocks:
            if t is None or t.num_rows == 0:
                continue
            kind = t["kind"]
            for r in pc.value_counts(kind).to_pylist():
                counts[r["values"]] = counts.get(r["values"], 0) + r["counts"]
            cd = t.filter(
                pc.is_in(kind, value_set=pa.array(["cand", "done"]))
            )
            if cd.num_rows == 0:
                continue
            # single pass: one sort by a fused (gshard, is_cand) code, then
            # zero-copy slices at searchsorted boundaries (the earlier
            # 2 x num_shards filters re-scanned cd per gshard)
            code = pc.add(
                pc.multiply(cd["gshard"], pa.scalar(2, pa.int32())),
                pc.cast(pc.equal(cd["kind"], "cand"), pa.int32()),
            ).combine_chunks()
            order = pc.sort_indices(code)
            cds = cd.take(order)
            codes = code.take(order).to_numpy()
            bounds = np.searchsorted(codes, np.arange(2 * num_shards + 1))
            for g in range(num_shards):
                d0, d1, c1 = bounds[2 * g], bounds[2 * g + 1], bounds[2 * g + 2]
                if d1 > d0:
                    done_parts[g].append(
                        cds.slice(d0, d1 - d0).select(["url_norm", "gshard"])
                    )
                if c1 > d1:
                    cand_parts[g].append(
                        cds.slice(d1, c1 - d1).select(
                            ["url_raw", "url_norm", "host", "depth", "gshard"]
                        )
                    )
        self._kind_counts = counts
        t_proc = time.perf_counter() - t0 - t_fetch
        out = {}
        for g in range(num_shards):
            cand = pa.concat_tables(cand_parts[g]) if cand_parts[g] else None
            done = pa.concat_tables(done_parts[g]) if done_parts[g] else None
            out[g] = (
                ray.put(cand) if cand is not None else None,
                ray.put(done) if done is not None else None,
            )
        if os.environ.get("RAYCRAWL_TIMING") == "1" and self.shard_id == 0:
            print(
                f"[split s0] fetch {t_fetch:.2f}s proc {t_proc:.2f}s "
                f"put {time.perf_counter() - t0 - t_fetch - t_proc:.2f}s "
                f"blocks {len(blocks)}",
                flush=True,
            )
        return out

    def gate_pieces(self, piece_refs, num_shards: int) -> pa.Table:
        """Round-commit wave 2 (phase A): gate MY gshard's pieces gathered
        from every stripe-splitter's output (zero-copy plasma reads of
        only my rows)."""
        import time

        t0 = time.perf_counter()
        cands = [ray.get(c) for c, _ in piece_refs if c is not None]
        dones = [ray.get(d) for _, d in piece_refs if d is not None]
        cand = pa.concat_tables(cands) if cands else None
        done = pa.concat_tables(dones) if dones else None
        t1 = time.perf_counter()
        out = self.gate_round(cand, done, num_shards, prebucketed=True)
        if os.environ.get("RAYCRAWL_TIMING") == "1" and self.shard_id == 0:
            print(
                f"[gate s0] fetch {t1 - t0:.2f}s gate {time.perf_counter() - t1:.2f}s "
                f"cand {cand.num_rows if cand is not None else 0} "
                f"done {done.num_rows if done is not None else 0}",
                flush=True,
            )
        return out

    def gate_pieces_at(self, num_shards: int, *piece_maps) -> pa.Table:
        """gate_pieces, but taking every splitter's WHOLE piece map (the
        split_stripe return values, passed ref-to-ref as top-level args so
        Ray resolves them and the driver never ray.gets between the waves
        — the commit chain runs entirely actor-side). Picks this shard's
        gshard entry from each map."""
        pieces = [pm[self.shard_id] for pm in piece_maps]
        return self.gate_pieces(pieces, num_shards)

    def last_kind_counts(self) -> dict:
        """Kind counts of this shard's block stripe from the preceding
        split_stripe call (sum across shards = the round's counts)."""
        return getattr(self, "_kind_counts", {})

    # ---- columnar pending machinery ---------------------------------------
    def _append_pending(self, tbl: pa.Table) -> int:
        if tbl.num_rows == 0:
            return 0
        self._incoming.append(tbl)
        self._pending_n += tbl.num_rows
        return tbl.num_rows

    def _merged_pending(self) -> pa.Table:
        """Merge incoming appends into the sorted pending table. Sort key
        (host, depth, url_norm, url_raw) = the deterministic release order:
        hosts in sorted order, each host's rows by (depth, url_norm) —
        byte-identical to the per-host-heap order of the earlier design."""
        import pyarrow.compute as pc

        if self._incoming:
            parts = ([self._pending_tbl] if self._pending_tbl.num_rows else [])
            parts += [t.cast(FRONTIER_SCHEMA) for t in self._incoming]
            self._incoming = []
            tbl = pa.concat_tables(parts)
            self._pending_tbl = tbl.take(
                pc.sort_indices(
                    tbl,
                    sort_keys=[("host", "ascending"), ("depth", "ascending"),
                               ("url_norm", "ascending"),
                               ("url_raw", "ascending")],
                )
            )
        return self._pending_tbl

    def enqueue_round(self, num_shards: int, *tbls) -> dict:
        """Round barrier phase B (host-affine): from the gated tables of
        ALL gate shards, append the rows whose hosts I own to my pending
        state — one vectorized host filter + table append per gate table,
        no per-row work even for a hot host.

        Returns {enqueued, pending, kind_counts}: pending and the stripe's
        kind counts ride back on this call so the driver needs no extra
        actor waves per round (each wave is serial round-barrier time)."""
        import pyarrow.compute as pc

        n = 0
        for tbl in tbls:
            if tbl is None or tbl.num_rows == 0:
                continue
            hosts = tbl["host"]
            mine = [
                h
                for h in pc.unique(hosts).to_pylist()
                if h is not None and shard_of_host(h, num_shards) == self.shard_id
            ]
            if not mine:
                continue
            sub = tbl.filter(pc.is_in(hosts, value_set=pa.array(mine)))
            n += self._append_pending(sub.select(FRONTIER_SCHEMA.names))
        return {
            "enqueued": n,
            "pending": self._pending_n,
            "kind_counts": getattr(self, "_kind_counts", {}),
        }

    def offer_table(self, tbl: pa.Table) -> int:
        """offer_buffer from an Arrow candidate table (zero-copy from the
        object store; the driver routes one table per shard per round)."""
        self._buffer.extend(
            zip(
                tbl.column("url_raw").to_pylist(),
                tbl.column("url_norm").to_pylist(),
                tbl.column("host").to_pylist(),
                tbl.column("depth").to_pylist(),
            )
        )
        return len(self._buffer)

    def mark_done_table(self, tbl: pa.Table) -> None:
        norms = tbl.column("url_norm").to_pylist()
        self._done.update(norms)
        self._dirty_done.update(norms)
        self._done_chunks.append(tbl.column("url_norm").combine_chunks())

    def commit_round(self) -> int:
        """Round barrier (legacy single-call protocol): deterministically
        dedup buffered candidates, run the seen-gate, enqueue the unseen.
        Returns number enqueued.

        Dedup keeps the min (depth, url_raw) representative per url_norm —
        a deterministic stand-in for the reference's hash-seed-dependent
        set-iteration pick (its own result SETS are unaffected, SURVEY §4).
        Gate semantics mirror crawler.py:159-163 + :219-221: an unseen url
        is ALWAYS added to seen; it is enqueued only if not already done
        (the rediscovered-seed case enters seen but is skipped at dequeue).
        """
        best = {}
        for url_raw, url_norm, host, depth in self._buffer:
            cur = best.get(url_norm)
            if cur is None or (depth, url_raw) < (cur[0], cur[1]):
                best[url_norm] = (depth, url_raw, host)
        self._buffer.clear()
        rows = {"url_raw": [], "url_norm": [], "host": [], "depth": []}
        for url_norm in sorted(best, key=lambda u: (best[u][0], u)):
            depth, url_raw, host = best[url_norm]
            if not self._seen_check_add(url_norm):
                self.stats["gate_dropped"] += 1
                continue
            self.stats["seen_added"] += 1
            if url_norm in self._done:
                continue
            rows["url_raw"].append(url_raw)
            rows["url_norm"].append(url_norm)
            rows["host"].append(host)
            rows["depth"].append(depth)
        return self._append_pending(pa.table(rows, schema=FRONTIER_SCHEMA))

    def seed(self, rows: list) -> int:
        """Enqueue seeds WITHOUT touching the seen-set — the reference only
        adds a seed to seen if it is re-discovered (crawler.py:198-199)."""
        cols = {"url_raw": [], "url_norm": [], "host": [], "depth": []}
        for url_raw, url_norm, host, depth in rows:
            if url_norm in self._done:
                continue
            cols["url_raw"].append(url_raw)
            cols["url_norm"].append(url_norm)
            cols["host"].append(host)
            cols["depth"].append(depth)
            self._seeded.add(url_norm)
        return self._append_pending(pa.table(cols, schema=FRONTIER_SCHEMA))

    # ---- politeness release ----------------------------------------------
    def _release_tbl(self, budgets: dict | None = None,
                     default_budget: int | None = None) -> pa.Table:
        """This round's fetchable rows as one sorted Arrow table,
        per-host-serial politeness applied; deferred rows stay pending.

        budgets: host -> max rows this round (crawl_delay-derived); hosts
        absent use default_budget; budget None = unlimited. Rows come out
        host-sorted, (depth, url_norm)-ordered within a host —
        deterministic. Everything is vectorized: one lazy merge-sort of
        pending, run-length host boundaries, numpy slice assembly."""
        import pyarrow.compute as pc

        tbl = self._merged_pending()
        if tbl.num_rows == 0:
            return FRONTIER_SCHEMA.empty_table()

        # done check at dequeue (crawler.py:219-221): only seed urls and
        # directly-marked done urls can be pending-while-done (any other
        # url enters pending exactly once via the seen-gate and cannot
        # complete before its only copy releases)
        drop = {u for u in self._seeded if u in self._done}
        drop |= self._dirty_done
        if drop:
            mask = pc.is_in(tbl["url_norm"],
                            value_set=pa.array(sorted(drop), pa.string()))
            n_drop = pc.sum(mask).as_py() or 0
            if n_drop:
                tbl = tbl.filter(pc.invert(mask))
                self._pending_n -= n_drop
                self._pending_tbl = tbl

        if not budgets and default_budget is None:
            # unbudgeted: release everything
            self._pending_tbl = FRONTIER_SCHEMA.empty_table()
            self._pending_n = 0
            self.stats["released"] += tbl.num_rows
            return tbl

        budgets = budgets or {}
        # per-host runs derived directly from the host-sorted column
        # (adjacent not_equal -> run boundaries) so correctness never
        # depends on undocumented value_counts ordering
        col = tbl["host"].combine_chunks()
        n = len(col)
        neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        change = np.flatnonzero(
            neq.to_numpy(zero_copy_only=False)
        ).astype(np.int64) + 1
        starts = np.concatenate([np.zeros(1, dtype=np.int64), change])
        counts = np.diff(np.concatenate([starts, [n]]))
        hosts = col.take(pa.array(starts, pa.int64())).to_pylist()
        takes = np.empty(len(counts), dtype=np.int64)
        for i, h in enumerate(hosts):
            b = budgets.get(h, default_budget)
            takes[i] = counts[i] if b is None else min(b, counts[i])
            if takes[i] < counts[i]:
                self.stats["deferred_rounds"] += 1
        rel_idx = np.concatenate(
            [np.arange(s, s + t) for s, t in zip(starts, takes)]
        ) if len(counts) else np.empty(0, dtype=np.int64)
        keep_idx = np.concatenate(
            [np.arange(s + t, s + c)
             for s, t, c in zip(starts, takes, counts)]
        ) if len(counts) else np.empty(0, dtype=np.int64)
        out = tbl.take(pa.array(rel_idx, pa.int64()))
        self._pending_tbl = tbl.take(pa.array(keep_idx, pa.int64()))
        self._pending_n = self._pending_tbl.num_rows
        self.stats["released"] += out.num_rows
        return out

    def release(self, budgets: dict | None = None,
                default_budget: int | None = None) -> dict:
        """_release_tbl as columnar python lists (legacy/unit-test API)."""
        return self._release_tbl(budgets, default_budget).to_pydict()

    def release_table(self, budgets: dict | None = None,
                      default_budget: int | None = None) -> pa.Table:
        """release as a zero-copy Arrow table — the driver passes the
        ObjectRef straight into ``ray.data.from_arrow_refs`` so the frontier
        never materializes on the driver."""
        tbl = self._release_tbl(budgets, default_budget)
        self._last_release_count = tbl.num_rows
        return tbl

    def last_release_count(self) -> int:
        """Row count of the preceding release call (actor tasks run in
        submission order, so calling this right after a release is safe and
        keeps the table itself off the driver)."""
        return getattr(self, "_last_release_count", 0)

    def release_chunks(self, budgets: dict | None = None,
                       default_budget: int | None = None,
                       chunk_rows: int = 2048,
                       target_chunks: int | None = None) -> dict:
        """Stage this round's release as <=chunk_rows Arrow slices. The
        salted-repartition path for skewed hosts (north_rule): a hot host's
        release splits into many blocks so the fetch stage parallelizes
        across the cluster, while politeness stays per-host-serial HERE, at
        release time. Fetch the slices with fetch_chunk(i) — each is its
        own Dataset block.

        ``target_chunks`` sizes chunks shard-locally (chunk_rows becomes
        the cap): the driver can submit this call CHAINED after
        enqueue_round without knowing the round's width. Returns
        {chunks, released, pending} so one ray.get closes the whole
        enqueue->release chain."""
        tbl = self._release_tbl(budgets, default_budget)
        self._last_release_count = tbl.num_rows
        if target_chunks:
            chunk_rows = max(64, min(chunk_rows,
                                     -(-tbl.num_rows // target_chunks)))
        self._staged = [
            tbl.slice(i, chunk_rows) for i in range(0, tbl.num_rows, chunk_rows)
        ]
        return {
            "chunks": len(self._staged),
            "released": tbl.num_rows,
            "pending": self._pending_n,
        }

    def fetch_chunk(self, i: int) -> pa.Table:
        return self._staged[i]

    # ---- done bookkeeping -------------------------------------------------
    def mark_done(self, url_norms: list) -> None:
        self._done.update(url_norms)
        self._dirty_done.update(url_norms)
        if url_norms:
            self._done_chunks.append(pa.array(url_norms, pa.string()))

    def pending_count(self) -> int:
        return self._pending_n

    def host_demand(self) -> dict:
        """host -> pending row count for this shard's hosts (the demand
        side of the auto politeness budget). Submitted right after
        enqueue_round, actor ordering makes it see the full round's
        pending; O(hosts) output, the pending rows never move."""
        tbl = self._merged_pending()
        if tbl.num_rows == 0:
            return {}
        vc = tbl["host"].combine_chunks().value_counts()
        return {
            d["values"]: d["counts"] for d in vc.to_pylist()
        }

    def counts(self) -> dict:
        import pyarrow.compute as pc

        seen_n = len(self._seen) if self.seen_mode == "exact" else self._cuckoo.size
        pend = self._merged_pending()
        n_hosts = (
            len(pc.unique(pend["host"].combine_chunks())) if pend.num_rows else 0
        )
        out = {"shard": self.shard_id, "seen": seen_n, "done": len(self._done),
               "pending": self._pending_n, "hosts": n_hosts,
               **self.stats}
        if self.seen_mode == "cuckoo":
            # expected false-positive budget of the 4-slot/16-bit filter at
            # its CURRENT load (2 buckets x 4 slots x 2^-16 per probe);
            # a false positive silently drops one genuinely-new URL
            load = self._cuckoo.size / (self._cuckoo.n_buckets * self._cuckoo.SLOTS)
            out["cuckoo_load"] = round(load, 4)
            out["cuckoo_fp_rate"] = round(load * 8 / 65536, 8)
            out["cuckoo_overflow"] = len(self._cuckoo.overflow)
        return out

    # ---- introspection (tests / conformance) ------------------------------
    def seen_snapshot(self) -> list:
        if self.seen_mode != "exact":
            raise RuntimeError("seen_snapshot requires exact mode")
        return sorted(self._seen)

    def done_snapshot(self) -> list:
        return sorted(self._done)

    # ---- checkpoint / restore --------------------------------------------
    def checkpoint(self, ckpt_dir: str, round_no: int,
                   keep_rounds: int = 2) -> dict:
        """Atomically persist shard state as a PER-ROUND file; returns
        lineage info (incl. the exact path) for the driver manifest.

        Per-round files are load-bearing for crash consistency: a crash
        between "some shards checkpointed round r+1" and "manifest updated"
        must not mix rounds — the manifest names the exact files of ONE
        consistent round, and restore loads only those. Files older than
        keep_rounds manifested rounds are pruned.
        """
        os.makedirs(ckpt_dir, exist_ok=True)
        # pending persists in the legacy {host: [(depth, url_norm,
        # url_raw), ...]} form (rows already host+depth sorted) so old
        # checkpoints stay restorable
        pend = self._merged_pending()
        pending: dict = {}
        for host, depth, url_norm, url_raw in zip(
            pend["host"].to_pylist(), pend["depth"].to_pylist(),
            pend["url_norm"].to_pylist(), pend["url_raw"].to_pylist(),
        ):
            pending.setdefault(host, []).append((depth, url_norm, url_raw))
        state = {
            "shard_id": self.shard_id,
            "seen_mode": self.seen_mode,
            "round": round_no,
            "done": sorted(self._done),
            "pending": pending,
            "seeded": sorted(self._seeded),
            "buffer": list(self._buffer),  # empty at round boundaries
            "stats": self.stats,
        }
        if self.seen_mode == "exact":
            state["seen"] = sorted(self._seen)
        else:
            state["cuckoo"] = self._cuckoo.to_state()
        path = os.path.join(
            ckpt_dir, f"shard_{self.shard_id}_round_{round_no}.pkl"
        )
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)
        # prune old rounds for this shard
        import re as _re

        pat = _re.compile(rf"^shard_{self.shard_id}_round_(\d+)\.pkl$")
        rounds = sorted(
            int(m.group(1))
            for fn in os.listdir(ckpt_dir)
            for m in [pat.match(fn)]
            if m
        )
        for r in rounds[:-keep_rounds] if keep_rounds else []:
            try:
                os.remove(os.path.join(ckpt_dir, f"shard_{self.shard_id}_round_{r}.pkl"))
            except OSError:
                pass
        seen_n = len(self._seen) if self.seen_mode == "exact" else self._cuckoo.size
        return {"shard": self.shard_id, "path": path, "round": round_no,
                "seen": seen_n, "done": len(state["done"]),
                "pending": self._pending_n}

    def restore(self, path: str) -> int:
        """Restore from an exact checkpoint file (the manifest names it).
        A directory is also accepted (newest round for this shard)."""
        if os.path.isdir(path):
            import re as _re

            pat = _re.compile(rf"^shard_{self.shard_id}_round_(\d+)\.pkl$")
            rounds = sorted(
                int(m.group(1))
                for fn in os.listdir(path)
                for m in [pat.match(fn)]
                if m
            )
            if not rounds:
                raise FileNotFoundError(
                    f"no checkpoint for shard {self.shard_id} in {path}"
                )
            path = os.path.join(
                path, f"shard_{self.shard_id}_round_{rounds[-1]}.pkl"
            )
        with open(path, "rb") as f:
            state = pickle.load(f)
        assert state["shard_id"] == self.shard_id
        self.seen_mode = state["seen_mode"]
        if self.seen_mode == "exact":
            self._seen = set(state["seen"])
        else:
            self._cuckoo = CuckooFilter.from_state(state["cuckoo"])
        self._done = set(state["done"])
        # mirrors rebuild lazily from the restored sets at the next gate
        self._seen_chunks, self._done_chunks = [], []
        self._seen_mirror_dirty = self._done_mirror_dirty = True
        cols = {"url_raw": [], "url_norm": [], "host": [], "depth": []}
        for host in sorted(state["pending"]):
            for depth, url_norm, url_raw in sorted(
                tuple(r) for r in state["pending"][host]
            ):
                cols["url_raw"].append(url_raw)
                cols["url_norm"].append(url_norm)
                cols["host"].append(host)
                cols["depth"].append(depth)
        self._pending_tbl = pa.table(cols, schema=FRONTIER_SCHEMA)
        self._incoming = []
        self._pending_n = self._pending_tbl.num_rows
        # dequeue-time done check coverage after restore: pending∩done is
        # exactly the set the check can ever fire on, so union it in (this
        # also restores the effect of pre-checkpoint mark_done calls)
        self._seeded = set(state.get("seeded", ())) | self._done.intersection(
            cols["url_norm"]
        )
        self._dirty_done = set()
        self._buffer = [tuple(r) for r in state.get("buffer", [])]
        self.stats = state["stats"]
        return state["round"]


def make_frontier_shards(num_shards: int, seen_mode: str = "exact",
                         cuckoo_capacity: int = 1 << 20, seed: int = 0) -> list:
    return [
        FrontierShard.remote(i, seen_mode=seen_mode,
                             cuckoo_capacity=cuckoo_capacity, seed=seed)
        for i in range(num_shards)
    ]
