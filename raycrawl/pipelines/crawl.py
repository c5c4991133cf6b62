"""The crawl pipeline: iterative BFS rounds over Ray Data.

Dataflow per round (SURVEY §3.4; replaces the reference's dispatch loop,
/root/reference/simple_crawler/crawler.py:196-242):

    map_batches(CrawlRoundStage)         ONE fused, PURE stage: robots gate
                                         + corpus fetch-sim + extract +
                                         canonicalize + row routing; emits a
                                         tall event table (done/error/edge/
                                         blocked/cand rows, no html bodies)
    [barrier] = materialize()            pure stage -> materialization IS
                                         the round barrier
    split -> gate -> enqueue ->          ONE submission-ordered actor chain,
      [checkpoint] -> release            no driver round trip in the middle
                                         (split: stripe kind-split; gate:
                                         BALANCED by hash(url_norm); enqueue:
                                         host-affine columnar append;
                                         release: NEXT round's chunks staged
                                         per-host politeness order, a hot
                                         host split into many blocks). The
                                         driver overlaps the round's Parquet
                                         write with this chain and blocks
                                         once, on the release wave.

Termination: every shard's pending queue is empty (the deterministic
dataflow translation of the reference's queue-timeout / seen==done exits,
crawler.py:206-217 — see SURVEY §2.5 A3).

Scale notes: the frontier never materializes on the driver
(``from_arrow_refs`` of per-shard chunk tables); per-round intermediates
hold no html; corpus bucket tables live ONCE per node in the object store
(BucketStore) and are mapped zero-copy by every worker; cand/done tables
ride the object store to the shards (one ref, N readers). With
``output_dir`` set, round outputs stream to ``rounds/round=<r>/`` Parquet
so a resumed run skips finished rounds. Measured on the skewed bench
corpus: 4->16 CPU scaling efficiency ~0.9 at comparable machine load.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from raycrawl.config import CrawlConfig
from raycrawl.functions.canonicalize import normalise_url, url_host
from raycrawl.sources.synth import N_BUCKETS_DEFAULT
from raycrawl.stages.extract_route import empty_tall
from raycrawl.stages.fetchsim import BucketStore
from raycrawl.stages.round_stage import CrawlRoundStage, make_round_task_fn
from raycrawl.state.frontier import make_frontier_shards, shard_of_host
from raycrawl.state.robots import RobotsCache

__all__ = ["crawl", "CrawlResult"]


@ray.remote(num_cpus=1)
def _run_round_chunk(round_fn, chunk: pa.Table) -> pa.Table:
    """One staged frontier chunk through the fused round stage ("tasks"
    mode). Plain tasks reuse worker processes, so round_fn's per-process
    stage cache stays warm across rounds; empty chunks are normalized here
    because — unlike map_batches — nothing filters them out upstream."""
    if chunk is None:
        round_fn(None)  # warmup probe: builds the per-process stage state
        return empty_tall()
    if chunk.num_rows == 0:
        return empty_tall()
    return round_fn(chunk)


@dataclass
class CrawlResult:
    """Crawl outputs. Tables are driver-side Arrow only when collect=True
    (tests / small crawls); with output_dir the Parquet on disk is the
    authoritative, resumable artifact."""

    config: CrawlConfig
    rounds: int
    metrics: list = field(default_factory=list)
    tall: pa.Table | None = None
    seen: list | None = None
    done: list | None = None
    output_dir: str | None = None
    # per-partition (shard) counters at crawl end: seen/done/pending,
    # released totals, cuckoo load + FP budget in cuckoo mode (north_rule:
    # per-partition metrics)
    shard_stats: list = field(default_factory=list)

    def done_urls(self) -> set:
        """Reference render-results parity: set of normalized done urls
        (crawler.py:244-251)."""
        return set(self.done or [])

    def seen_urls(self) -> set:
        return set(self.seen or [])

    def _kind(self, kind: str) -> pa.Table:
        t = self.tall if self.tall is not None else self._read_rounds()
        return t.filter(pc.equal(t["kind"], kind))

    def _read_rounds(self) -> pa.Table:
        import pyarrow.dataset as pads

        return pads.dataset(
            os.path.join(self.output_dir, "rounds"), partitioning="hive"
        ).to_table()

    def edges(self) -> pa.Table:
        return self._kind("edge")

    def errors(self) -> pa.Table:
        return self._kind("error")

    def done_table(self) -> pa.Table:
        return self._kind("done")

    def depths(self) -> dict:
        """url_norm -> BFS discovery depth for done pages."""
        t = self.done_table()
        return dict(zip(t["url_norm"].to_pylist(), t["depth"].to_pylist()))


def _seed_rows(seeds, num_shards):
    by_shard = {}
    seen_norm = set()
    for s in seeds:
        norm = normalise_url(s)
        if norm in seen_norm:  # equal-normalized seeds fetch once
            continue
        seen_norm.add(norm)
        host = url_host(s)
        by_shard.setdefault(shard_of_host(host, num_shards), []).append(
            (s, norm, host, 0)
        )
    return by_shard


def _write_manifest(output_dir, round_no, cfg_hash, shard_infos, counts,
                    shard_stats=None, keep_rounds=2):
    manifest = {
        "round": round_no,
        "config_hash": cfg_hash,
        "shards": shard_infos,
        "counts": counts,
        # per-partition lineage + throughput (north_rule): shard-level
        # seen/done/pending/released counters at this round
        "shard_stats": shard_stats or [],
    }
    # per-round manifest history: a crash between shard checkpoints and the
    # latest-manifest rename can be recovered by rolling back to ANY prior
    # round's manifest (rounds are deterministic given restored state)
    hist = os.path.join(output_dir, f"manifest_round_{round_no}.json")
    with open(hist, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    path = os.path.join(output_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, path)  # manifest-last, atomic: partial rounds never resume
    # prune manifest history in lockstep with shard checkpoint retention
    import re as _re

    pat = _re.compile(r"^manifest_round_(\d+)\.json$")
    rounds = sorted(
        int(m.group(1))
        for fn in os.listdir(output_dir)
        for m in [pat.match(fn)]
        if m
    )
    for r in rounds[:-keep_rounds] if keep_rounds else []:
        try:
            os.remove(os.path.join(output_dir, f"manifest_round_{r}.json"))
        except OSError:
            pass


def _load_manifest(output_dir):
    path = os.path.join(output_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def crawl(
    corpus_path: str,
    seeds,
    config: CrawlConfig | None = None,
    output_dir: str | None = None,
    n_buckets: int = N_BUCKETS_DEFAULT,
    collect: bool = True,
    resume: bool = False,
) -> CrawlResult:
    """Run the BFS crawl of ``seeds`` against a Parquet corpus.

    Ray must already be initialised (library code never calls ray.init).
    ``collect=True`` keeps the per-round tall tables on the driver (fine for
    tests/small crawls); at scale pass ``output_dir`` and ``collect=False``.
    ``resume=True`` restores frontier shards from ``output_dir/checkpoints``
    via the manifest and continues after the last committed round.
    """
    if not os.path.exists(corpus_path):
        raise FileNotFoundError(f"corpus path does not exist: {corpus_path}")
    config = config or CrawlConfig()
    cfg_hash = config.config_hash()
    num_shards = config.num_shards

    shards = make_frontier_shards(
        num_shards,
        seen_mode=config.seen_mode,
        cuckoo_capacity=config.cuckoo_capacity,
    )

    robots_actor = None
    if config.obey_robots or config.politeness_budget == "robots":
        robots_actor = RobotsCache.remote(corpus_path)
    bucket_store = BucketStore.remote(corpus_path)
    # parallel bucket preload, fire-and-forget: the reads overlap seeding
    # and round-0 spin-up instead of serializing behind the first tasks
    # (lazy-in-the-actor loads measured as ~2 s of per-run serial cost)
    bucket_store.preload.remote(range(n_buckets))

    stage_kwargs = dict(
        corpus_path=corpus_path,
        n_buckets=n_buckets,
        config=config,
        robots_actor=robots_actor,
        bucket_store=bucket_store,
    )
    # "tasks" mode round fn, built + plasma-put once: its heavy state is
    # cached per worker PROCESS, so it stays warm across every round of
    # the crawl (the ref avoids re-pickling the closure per task)
    round_fn_ref = (
        ray.put(make_round_task_fn(**stage_kwargs))
        if config.stage_mode != "actors"
        else None
    )
    if round_fn_ref is not None and config.max_rounds > 0:
        # eager warmup wave, fire-and-forget, submitted BEFORE budgets /
        # resume / seeding so it overlaps the whole boot: one no-op probe
        # per fetch slot forces ALL worker processes to spawn, import the
        # library and build the cached stage state in PARALLEL at t=0.
        # Without it the cold-start is paid serially across rounds 0-2
        # (only the few workers round 0's blocks touch warm up; measured
        # ~2.5 s of the 16-CPU leg at the 1x corpus — the small-corpus
        # serial floor in BASELINE.md's scaling sections). Probes exit in
        # submission order ahead of round 0's real chunks queued behind
        # them on the same slots.
        for _ in range(config.fetch_concurrency):
            _run_round_chunk.remote(round_fn_ref, None)

    # politeness budgets: crawl_delay d -> at most round_window/d fetches of
    # that host per round (per-host-serial release inside the owning shard —
    # strictly more faithful at scale than the reference's global sleep,
    # crawler.py:229-239, while preserving its single-host behavior)
    budgets, default_budget, auto_total = {}, None, None
    if config.politeness_budget == "robots" and robots_actor is not None:
        texts = ray.get(robots_actor.all_texts.remote())
        delays = ray.get(
            robots_actor.delays.remote(config.user_agent, list(texts))
        )
        budgets = {
            h: max(1, int(config.round_window_s / d)) for h, d in delays.items()
        }
    elif isinstance(config.politeness_budget, str) and \
            config.politeness_budget.startswith("auto:"):
        # demand-proportional per-host quotas, recomputed every round by
        # the largest-remainder allocator over the round's pending demand
        # (frontier.hamilton_alloc — the crawl_budget_alloc query's method
        # driving the actual release). Hosts the allocation skips release
        # nothing that round; their demand persists and wins future slots
        # as other hosts drain, so the crawl always progresses.
        auto_total = int(config.politeness_budget.split(":", 1)[1])
        if auto_total < 1:
            raise ValueError("politeness_budget='auto:N' needs N >= 1")
    elif isinstance(config.politeness_budget, int):
        default_budget = config.politeness_budget

    start_round = 0
    if resume and output_dir:
        manifest = _load_manifest(output_dir)
        if manifest is not None:
            if manifest["config_hash"] != cfg_hash:
                raise ValueError("resume with a different config (hash mismatch)")
            # restore the EXACT per-round files the manifest names — never a
            # possibly-mixed "latest" set (crash-consistency)
            paths = {info["shard"]: info["path"] for info in manifest["shards"]}
            ray.get(
                [s.restore.remote(paths[i]) for i, s in enumerate(shards)]
            )
            start_round = manifest["round"] + 1
    if start_round == 0:
        if isinstance(seeds, str):
            seeds = pq.read_table(seeds)["url"].to_pylist()
        by_shard = _seed_rows(seeds, num_shards)
        ray.get(
            [shards[i].seed.remote(rows) for i, rows in by_shard.items()]
        )

    if output_dir:
        os.makedirs(os.path.join(output_dir, "rounds"), exist_ok=True)

    debug_timing = os.environ.get("RAYCRAWL_TIMING") == "1"
    collected = []
    metrics = []
    round_no = start_round

    # chunked release: a hot host's rows split into many Dataset blocks so
    # the fused round stage parallelizes across all cores/nodes even under
    # heavy host skew (politeness stays per-host-serial inside the shard);
    # the frontier never lands on the driver (from_arrow_refs). Chunks are
    # sized SHARD-LOCALLY (~3 per fetch worker cluster-wide, capped at
    # batch_size) so release can run chained after enqueue without the
    # driver knowing the round's width.
    target_chunks = max(1, -(-3 * config.fetch_concurrency // num_shards))

    def submit_release():
        if auto_total is not None:
            # chained, driver-free: per-shard demand (actor-ordered after
            # the preceding enqueue) -> one zero-CPU allocation task ->
            # releases taking the allocation as a resolved ObjectRef.
            # Hosts absent from the allocation get budget 0 this round.
            from raycrawl.state.frontier import alloc_round_budgets

            demand_refs = [s.host_demand.remote() for s in shards]
            alloc_ref = alloc_round_budgets.remote(auto_total, *demand_refs)
            return [
                s.release_chunks.remote(alloc_ref, 0,
                                        config.batch_size, target_chunks)
                for s in shards
            ]
        return [
            s.release_chunks.remote(budgets, default_budget,
                                    config.batch_size, target_chunks)
            for s in shards
        ]

    # prime the first round's release (seeds / restored pending) — unless
    # max_rounds forbids even round start_round (same pop-without-fetch
    # hazard as the chained release)
    rel = ray.get(submit_release()) if round_no < config.max_rounds else []
    n_released = sum(r["released"] for r in rel)
    if auto_total is not None:
        assert n_released <= auto_total, (
            f"auto budget violated: released {n_released} > {auto_total}"
        )
    n_chunks = [r["chunks"] for r in rel]

    while round_no < config.max_rounds and n_released > 0:
        t0 = time.perf_counter()
        phase = {}
        ref_tables = [
            shards[si].fetch_chunk.remote(i)
            for si, n in enumerate(n_chunks)
            for i in range(n)
        ]

        t1 = time.perf_counter()
        mat = None
        if config.stage_mode == "actors":
            frontier = rd.from_arrow_refs(ref_tables)
            tall = frontier.map_batches(
                CrawlRoundStage,
                fn_constructor_kwargs=stage_kwargs,
                batch_format="pyarrow",
                batch_size=config.batch_size,
                concurrency=(1, config.fetch_concurrency),
                num_cpus=1,
            )
            # round barrier: the stage is a pure transform, so materializing
            # it IS the barrier — no in-flight actor calls to wait for
            mat = tall.materialize()
            block_refs = mat.to_arrow_refs()
            if debug_timing and time.perf_counter() - t1 > 5:
                print(f"--- round {round_no} stats ---\n{mat.stats()}",
                      flush=True)
        else:
            # raw task wave: the chunks were already sized (<= batch_size,
            # ~3 per fetch worker) by the shards' release, so a Dataset adds
            # only per-round costs here — streaming-executor launch plus a
            # driver-side materialize barrier, the measured small-corpus
            # serial floor (BASELINE.md round-3/4 scaling sections). The
            # task wave has neither: its OUTPUT REFS feed the shard commit
            # chain below unresolved, so the whole round is one
            # submission-ordered chain and the driver never waits on fetch.
            block_refs = [
                _run_round_chunk.remote(round_fn_ref, ref)
                for ref in ref_tables
            ]
        phase["exec"] = round(time.perf_counter() - t1, 3)

        # route + commit, SHARD-side, as ONE submission-ordered actor
        # chain with no driver round trip in the middle: split -> gate ->
        # enqueue -> [checkpoint] -> release. The driver never holds a
        # round row and blocks exactly once, on the final release wave.
        #   split:   each shard kind-splits a DISJOINT stripe of the raw
        #            block refs (every block scanned once cluster-wide)
        #            and buckets cand/done rows by gshard into plasma
        #   gate:    phase A, BALANCED by hash(url_norm) — each shard
        #            gates its own gshard pieces (piece maps travel
        #            ref-to-ref, resolved by Ray, never by the driver)
        #   enqueue: phase B, host-affine politeness append
        #   release: NEXT round's chunks staged while the driver is still
        #            writing THIS round's output (overlap)
        t1 = time.perf_counter()
        split_refs = [
            s.split_stripe.remote(block_refs[i::num_shards], num_shards)
            for i, s in enumerate(shards)
        ]
        gated_refs = [
            s.gate_pieces_at.remote(num_shards, *split_refs) for s in shards
        ]
        enq_refs = [
            s.enqueue_round.remote(num_shards, *gated_refs) for s in shards
        ]
        do_ckpt = bool(
            output_dir and config.checkpoint_every
            and round_no % config.checkpoint_every == 0
        )
        if do_ckpt:
            # chained BETWEEN enqueue and release: the persisted pending
            # state must still contain the rows the next release will
            # stage, or a resume from this manifest would lose them
            ckpt_dir = os.path.join(output_dir, "checkpoints")
            ckpt_refs = [
                s.checkpoint.remote(ckpt_dir, round_no, config.checkpoint_keep)
                for s in shards
            ]
            stat_refs = [s.counts.remote() for s in shards]
        # the chained release pops rows from pending — never stage a round
        # that max_rounds forbids, or a truncated crawl's final counts()/
        # pending would under-report rows that were popped but never fetched
        last_round = round_no + 1 >= config.max_rounds
        rel_refs = None if last_round else submit_release()
        phase["submit"] = round(time.perf_counter() - t1, 3)

        # round output IO overlaps the commit chain running on the shards
        t1 = time.perf_counter()
        if output_dir:
            import shutil

            rdir = os.path.join(output_dir, "rounds", f"round={round_no}")
            # idempotent re-write: a resumed run replaying this round must
            # not append duplicate part files
            shutil.rmtree(rdir, ignore_errors=True)
            # distributed write: blocks stream from the workers, the
            # driver never serializes the round (the at-scale path)
            (mat if mat is not None else rd.from_arrow_refs(block_refs)) \
                .write_parquet(rdir)
        if collect:
            # driver-side round table only on request (tests / small crawls)
            tbls = ray.get(block_refs)
            collected.append(
                pa.concat_tables(tbls, promote_options="default")
                if tbls
                else empty_tall()
            )
        phase["io"] = round(time.perf_counter() - t1, 3)

        t1 = time.perf_counter()
        if debug_timing:
            # wave-by-wave waits (each wave is a global barrier for the
            # next anyway, so timing them sequentially is faithful)
            for nm, refs in (("w_split", split_refs),
                             ("w_gate", gated_refs), ("w_enq", enq_refs)):
                ray.get(refs)
                phase[nm] = round(time.perf_counter() - t1, 3)
                t1 = time.perf_counter()
        # rel_refs (when submitted) closes the whole chain; on the final
        # permitted round the chain closes at enqueue instead
        rel = ray.get(rel_refs) if rel_refs is not None else []
        enq = ray.get(enq_refs)
        phase["commit"] = round(time.perf_counter() - t1, 3)
        enqueued = sum(o["enqueued"] for o in enq)
        vc: dict = {}
        for o in enq:
            for k, n in o["kind_counts"].items():
                vc[k] = vc.get(k, 0) + n
        counts = {
            "round": round_no,
            "released": n_released,
            "done": vc.get("done", 0),
            "error": vc.get("error", 0),
            "edges": vc.get("edge", 0),
            "blocked": vc.get("blocked", 0),
            "enqueued": enqueued,
            "sec": round(time.perf_counter() - t0, 4),
        }
        if debug_timing:
            counts["phases"] = phase
        metrics.append(counts)

        if do_ckpt:
            shard_infos = ray.get(ckpt_refs)
            shard_stats = ray.get(stat_refs)
            _write_manifest(output_dir, round_no, cfg_hash, shard_infos,
                            counts, shard_stats, config.checkpoint_keep)

        round_no += 1
        # termination: the chained release came back empty — queues are
        # exhausted (budgets release >=1 row per nonempty host, so zero
        # released means zero pending). On a max_rounds-truncated crawl no
        # release was staged, so pending keeps the unfetched rows.
        n_released = sum(r["released"] for r in rel)
        if auto_total is not None and rel:
            assert n_released <= auto_total, (
                f"auto budget violated: released {n_released} > {auto_total}"
            )
        n_chunks = [r["chunks"] for r in rel]

    shard_stats = ray.get([s.counts.remote() for s in shards])
    seen = done = None
    if collect:
        # driver-side seen/done snapshots are test/conformance conveniences;
        # at 1e10 urls they are a driver OOM — gated behind collect, like
        # the per-round tables (counts live in shard_stats either way)
        if config.seen_mode == "exact":
            seen = sorted(
                set().union(*ray.get([s.seen_snapshot.remote() for s in shards]))
            )
        done = sorted(
            set().union(*ray.get([s.done_snapshot.remote() for s in shards]))
        )

    for s in shards:
        ray.kill(s)
    if robots_actor is not None:
        ray.kill(robots_actor)
    ray.kill(bucket_store)  # releases the plasma bucket tables

    tall_all = (
        pa.concat_tables(collected, promote_options="default")
        if collected
        else (empty_tall() if collect else None)
    )
    return CrawlResult(
        config=config,
        rounds=round_no - start_round,
        metrics=metrics,
        tall=tall_all,
        seen=seen,
        done=done,
        output_dir=output_dir,
        shard_stats=shard_stats,
    )
