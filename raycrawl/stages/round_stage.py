"""CrawlRoundStage — the fused per-round map_batches stage.

One stage = robots admission gate + fetch simulation + extraction/routing.
Fusing them means ONE worker pool per round instead of three Dataset
executions — per-round latency matters because the BFS loop is iterative.

Two execution modes (CrawlConfig.stage_mode):

* "actors" — the callable class IS the map_batches actor pool: state
  (corpus bucket index, compiled robots rules) loads once per actor and
  amortizes across the round's batches. Right for wide rounds (scale).
* "tasks"  — stateless task fn wrapping a per-worker-PROCESS cached stage
  instance (Ray reuses worker processes across tasks and rounds, so the
  corpus/robots caches stay warm across the WHOLE crawl with zero pool
  spin-up per round). Right for crawls with many small rounds.

Both modes hold identical state and produce identical output.
"""

from __future__ import annotations

import pyarrow as pa

from raycrawl.stages.extract_route import ExtractRouter, blocked_rows
from raycrawl.stages.fetchsim import FetchSimulator
from raycrawl.state.robots import RulesView

__all__ = ["CrawlRoundStage", "make_round_task_fn"]


class CrawlRoundStage:
    """frontier batch (url_raw, url_norm, host, depth) -> tall event table.

    Pure data transform — no actor round-trips in the hot path (see
    ExtractRouter docstring for why)."""

    def __init__(self, corpus_path, n_buckets, config, robots_actor=None,
                 bucket_store=None):
        self.config = config
        self.fetch = FetchSimulator(
            corpus_path=corpus_path,
            n_buckets=n_buckets,
            follow_redirects=not config.record_redirects,
            load_body_mimes=config.allowed_mime_types,
            check_head=config.check_head,
            bucket_store=bucket_store,
        )
        self.rules = (
            RulesView(robots_actor)
            if (config.obey_robots and robots_actor is not None)
            else None
        )
        self.route = ExtractRouter(config, max_depth=config.max_depth)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blocked = None
        if self.rules is not None:
            hosts = batch.column("host").to_pylist()
            norms = batch.column("url_norm").to_pylist()
            ua = self.config.user_agent
            mask = [self.rules.allowed(ua, h, u) for h, u in zip(hosts, norms)]
            arr = pa.array(mask, pa.bool_())
            if not all(mask):
                import pyarrow.compute as pc

                b = batch.filter(pc.invert(arr))
                blocked = blocked_rows(
                    b["url_norm"].to_pylist(),
                    b["host"].to_pylist(),
                    b["depth"].to_pylist(),
                )
                batch = batch.filter(arr)
        tall = self.route(self.fetch(batch))
        if blocked is not None:
            tall = pa.concat_tables([tall, blocked])
        return tall


# per-worker-process stage cache for "tasks" mode
_STAGE_CACHE: dict = {}


def make_round_task_fn(corpus_path, n_buckets, config, robots_actor=None,
                       bucket_store=None):
    """Build a plain map_batches function whose heavy state is cached per
    worker process (keyed by config hash + corpus + actor identities, so
    concurrent crawls don't cross wires)."""
    key = (
        corpus_path,
        n_buckets,
        config.config_hash(),
        str(robots_actor),
        str(bucket_store),
    )

    def round_fn(batch: pa.Table) -> pa.Table:
        stage = _STAGE_CACHE.get(key)
        if stage is None:
            stage = CrawlRoundStage(
                corpus_path, n_buckets, config, robots_actor, bucket_store
            )
            _STAGE_CACHE.clear()  # one live crawl per worker is the norm
            _STAGE_CACHE[key] = stage
        if batch is None:
            # warmup probe (crawl()'s eager wave): the expensive part was
            # getting HERE — worker spawn + library import + stage build —
            # so the probe just returns
            return None
        import os

        if os.environ.get("RAYCRAWL_PROFILE") == "1":
            import cProfile
            import pstats
            import time

            pr = cProfile.Profile()
            t0 = time.perf_counter()
            pr.enable()
            out = stage(batch)
            pr.disable()
            dt = time.perf_counter() - t0
            if dt > 2.0:
                path = f"/tmp/rf_prof_{os.getpid()}_{int(t0)}.txt"
                with open(path, "w") as f:
                    pstats.Stats(pr, stream=f).sort_stats("cumulative").print_stats(25)
            return out
        return stage(batch)

    return round_fn
