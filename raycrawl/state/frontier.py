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

import heapq
import os
import pickle

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


def shard_of_host(host: str, num_shards: int) -> int:
    return url_hash64("host:" + host) % num_shards


# num_cpus=0.1: a reservation, not a limit — shard work runs at the round
# BARRIER while the fetch pool is idle, but Ray Data subtracts reserved
# actor CPUs from the map stage's slots. At 0.25 x 4 shards a 4-CPU run
# lost a third of its fetch workers to idle reservations (measured: 2.2
# effective workers of 4); 0.1 keeps the scheduler honest without
# throttling barrier-time work.
@ray.remote(num_cpus=0.1)
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
        # host -> heap of (depth, url_norm, url_raw)
        self._pending: dict = {}
        self._pending_n = 0
        # candidates buffered within a round, committed at the round barrier
        self._buffer: list = []
        self.stats = {"seen_added": 0, "gate_dropped": 0, "released": 0,
                      "deferred_rounds": 0}

    # ---- seen-gate --------------------------------------------------------
    def _seen_check_add(self, url_norm: str) -> bool:
        """True if url was unseen (and is now marked seen)."""
        if self.seen_mode == "exact":
            if url_norm in self._seen:
                return False
            self._seen.add(url_norm)
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

    def gate_round(self, cand_tbl, done_tbl, num_shards: int) -> pa.Table:
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
        import pyarrow.compute as pc

        def mine(tbl):
            # gshard was computed in the extract stage (distributed);
            # selecting my partition is one vectorized equality filter
            if tbl is None or tbl.num_rows == 0:
                return None
            sub = tbl.filter(pc.equal(tbl["gshard"], self.shard_id))
            return sub if sub.num_rows else None

        done_mine = mine(done_tbl)
        if done_mine is not None:
            self._done.update(done_mine["url_norm"].to_pylist())

        cand_mine = mine(cand_tbl)
        if cand_mine is None:
            return FRONTIER_SCHEMA.empty_table()

        # deterministic dedup: sort by (url_norm, depth, url_raw), keep the
        # first row of each url_norm run — all vectorized
        idx = pc.sort_indices(
            cand_mine,
            sort_keys=[("url_norm", "ascending"), ("depth", "ascending"),
                       ("url_raw", "ascending")],
        )
        sub = cand_mine.take(idx)
        norms = sub["url_norm"].combine_chunks()
        if len(norms) > 1:
            prev = pa.concat_arrays(
                [pa.array([None], pa.string()), norms.slice(0, len(norms) - 1)]
            )
            sub = sub.filter(pc.fill_null(pc.not_equal(norms, prev), True))

        norm_list = sub["url_norm"].to_pylist()
        if self.seen_mode == "exact":
            # C-speed set algebra: unseen = candidates - seen; everything
            # gated becomes seen; only unseen-and-not-done rows come out
            norm_set = set(norm_list)
            fresh = norm_set - self._seen
            self._seen |= norm_set
            accepted = fresh - self._done
            self.stats["gate_dropped"] += len(norm_set) - len(fresh)
            self.stats["seen_added"] += len(fresh)
            keep = [u in accepted for u in norm_list]
        else:
            keep = []
            for u in norm_list:
                if self._seen_check_add(u):
                    self.stats["seen_added"] += 1
                    keep.append(u not in self._done)
                else:
                    self.stats["gate_dropped"] += 1
                    keep.append(False)
        out = sub.filter(pa.array(keep, pa.bool_())).select(
            ["url_raw", "url_norm", "host", "depth"]
        )
        # (depth, url_norm) ordering for deterministic enqueue downstream
        return out.take(
            pc.sort_indices(
                out, sort_keys=[("depth", "ascending"), ("url_norm", "ascending")]
            )
        ).cast(FRONTIER_SCHEMA)

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
        import pyarrow.compute as pc

        counts: dict = {}
        cand_parts: dict = {g: [] for g in range(num_shards)}
        done_parts: dict = {g: [] for g in range(num_shards)}
        for t in ray.get(list(block_refs)):
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
            is_cand = pc.equal(cd["kind"], "cand")
            for g in range(num_shards):
                sub = cd.filter(pc.and_(pc.equal(cd["gshard"], g), is_cand))
                if sub.num_rows:
                    cand_parts[g].append(
                        sub.select(
                            ["url_raw", "url_norm", "host", "depth", "gshard"]
                        )
                    )
                subd = cd.filter(
                    pc.and_(pc.equal(cd["gshard"], g), pc.invert(is_cand))
                )
                if subd.num_rows:
                    done_parts[g].append(subd.select(["url_norm", "gshard"]))
        self._kind_counts = counts
        out = {}
        for g in range(num_shards):
            cand = pa.concat_tables(cand_parts[g]) if cand_parts[g] else None
            done = pa.concat_tables(done_parts[g]) if done_parts[g] else None
            out[g] = (
                ray.put(cand) if cand is not None else None,
                ray.put(done) if done is not None else None,
            )
        return out

    def gate_pieces(self, piece_refs, num_shards: int) -> pa.Table:
        """Round-commit wave 2 (phase A): gate MY gshard's pieces gathered
        from every stripe-splitter's output (zero-copy plasma reads of
        only my rows)."""
        cands = [ray.get(c) for c, _ in piece_refs if c is not None]
        dones = [ray.get(d) for _, d in piece_refs if d is not None]
        cand = pa.concat_tables(cands) if cands else None
        done = pa.concat_tables(dones) if dones else None
        return self.gate_round(cand, done, num_shards)

    def last_kind_counts(self) -> dict:
        """Kind counts of this shard's block stripe from the preceding
        split_stripe call (sum across shards = the round's counts)."""
        return getattr(self, "_kind_counts", {})

    def enqueue_round(self, num_shards: int, *tbls) -> dict:
        """Round barrier phase B (host-affine): from the gated tables of
        ALL gate shards, enqueue the rows whose hosts I own into my
        per-host politeness heaps. Cheap (vectorized host filter +
        heappush) — fine even for a hot host.

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
            for url_raw, url_norm, host, depth in zip(
                sub["url_raw"].to_pylist(),
                sub["url_norm"].to_pylist(),
                sub["host"].to_pylist(),
                sub["depth"].to_pylist(),
            ):
                heapq.heappush(self._pending.setdefault(host, []),
                               (depth, url_norm, url_raw))
                self._pending_n += 1
                n += 1
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
        self._done.update(tbl.column("url_norm").to_pylist())

    def commit_round(self) -> int:
        """Round barrier: deterministically dedup buffered candidates, run
        the seen-gate, enqueue the unseen. Returns number enqueued.

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
        n = 0
        for url_norm in sorted(best, key=lambda u: (best[u][0], u)):
            depth, url_raw, host = best[url_norm]
            if not self._seen_check_add(url_norm):
                self.stats["gate_dropped"] += 1
                continue
            self.stats["seen_added"] += 1
            if url_norm in self._done:
                continue
            heapq.heappush(self._pending.setdefault(host, []),
                           (depth, url_norm, url_raw))
            self._pending_n += 1
            n += 1
        return n

    def seed(self, rows: list) -> int:
        """Enqueue seeds WITHOUT touching the seen-set — the reference only
        adds a seed to seen if it is re-discovered (crawler.py:198-199)."""
        n = 0
        for url_raw, url_norm, host, depth in rows:
            if url_norm in self._done:
                continue
            heapq.heappush(self._pending.setdefault(host, []),
                           (depth, url_norm, url_raw))
            self._pending_n += 1
            n += 1
        return n

    # ---- politeness release ----------------------------------------------
    def release(self, budgets: dict | None = None, default_budget: int | None = None) -> dict:
        """Pop this round's fetchable rows, per-host-serial politeness.

        budgets: host -> max rows this round (crawl_delay-derived); hosts
        absent use default_budget; budget None = unlimited. Rows come out in
        (depth, url_norm) order per host — deterministic. Returns columnar
        {url_raw, url_norm, host, depth}; deferred rows stay queued.
        """
        out = {"url_raw": [], "url_norm": [], "host": [], "depth": []}
        budgets = budgets or {}
        for host in sorted(self._pending):
            heap = self._pending[host]
            budget = budgets.get(host, default_budget)
            take = len(heap) if budget is None else min(budget, len(heap))
            if take < len(heap):
                self.stats["deferred_rounds"] += 1
            for _ in range(take):
                depth, url_norm, url_raw = heapq.heappop(heap)
                # done check at dequeue (crawler.py:219-221): seeds that were
                # re-discovered after completing land here
                if url_norm in self._done:
                    self._pending_n -= 1
                    continue
                out["url_raw"].append(url_raw)
                out["url_norm"].append(url_norm)
                out["host"].append(host)
                out["depth"].append(depth)
                self._pending_n -= 1
                self.stats["released"] += 1
            if not heap:
                del self._pending[host]
        return out

    def release_table(self, budgets: dict | None = None,
                      default_budget: int | None = None) -> pa.Table:
        """release() as a zero-copy Arrow table — the driver passes the
        ObjectRef straight into ``ray.data.from_arrow_refs`` so the frontier
        never materializes on the driver."""
        tbl = pa.table(self.release(budgets, default_budget),
                       schema=FRONTIER_SCHEMA)
        self._last_release_count = tbl.num_rows
        return tbl

    def last_release_count(self) -> int:
        """Row count of the preceding release call (actor tasks run in
        submission order, so calling this right after a release is safe and
        keeps the table itself off the driver)."""
        return getattr(self, "_last_release_count", 0)

    def release_chunks(self, budgets: dict | None = None,
                       default_budget: int | None = None,
                       chunk_rows: int = 2048) -> int:
        """Stage this round's release as <=chunk_rows Arrow slices; returns
        the chunk count. The salted-repartition path for skewed hosts
        (north_rule): a hot host's release splits into many blocks so the
        fetch stage parallelizes across the cluster, while politeness stays
        per-host-serial HERE, at release time. Fetch the slices with
        fetch_chunk(i) — each is its own Dataset block."""
        tbl = pa.table(self.release(budgets, default_budget),
                       schema=FRONTIER_SCHEMA)
        self._last_release_count = tbl.num_rows
        self._staged = [
            tbl.slice(i, chunk_rows) for i in range(0, tbl.num_rows, chunk_rows)
        ]
        return len(self._staged)

    def fetch_chunk(self, i: int) -> pa.Table:
        return self._staged[i]

    # ---- done bookkeeping -------------------------------------------------
    def mark_done(self, url_norms: list) -> None:
        self._done.update(url_norms)

    def pending_count(self) -> int:
        return self._pending_n

    def counts(self) -> dict:
        seen_n = len(self._seen) if self.seen_mode == "exact" else self._cuckoo.size
        out = {"shard": self.shard_id, "seen": seen_n, "done": len(self._done),
               "pending": self._pending_n, "hosts": len(self._pending),
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
        state = {
            "shard_id": self.shard_id,
            "seen_mode": self.seen_mode,
            "round": round_no,
            "done": sorted(self._done),
            "pending": {h: sorted(q) for h, q in self._pending.items()},
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
        self._pending = {}
        self._pending_n = 0
        for host, rows in state["pending"].items():
            heap = [tuple(r) for r in rows]
            heapq.heapify(heap)
            self._pending[host] = heap
            self._pending_n += len(heap)
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
