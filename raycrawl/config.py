"""Crawl configuration — the engine's user-extension surface.

Mirrors the reference's ``Crawler(**config)`` kwargs
(/root/reference/simple_crawler/crawler.py:59-88) plus the knobs a
distributed Ray Data engine needs (sharding, batching, checkpointing,
corpus location). Frozen so a config hash can key checkpoint lineage.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

DEFAULT_USER_AGENT = "RayCrawl"


@dataclass(frozen=True)
class CrawlConfig:
    # ---- reference-parity knobs (crawler.py:59-88, cli.py:9-14) ----
    user_agent: str = DEFAULT_USER_AGENT
    obey_robots: bool = True
    check_head: bool = False
    trim_query: bool = True
    trim_fragment: bool = True
    record_redirects: bool = False          # crawler.py:86-88 (off by default)
    allowed_mime_types: tuple = ("text/html",)  # requester.py:84
    headers: tuple = ()                     # injectable session headers parity

    # ---- canonicalizer extension (north_star; OFF = conformance mode) ----
    strip_default_ports: bool = False

    # ---- distributed execution knobs ----
    num_shards: int = 4                     # frontier/seen actor shards
    fetch_concurrency: int = 4              # round-stage worker pool size
    batch_size: int = 4096                  # rows per Arrow batch in map_batches
    # "tasks": per-round stage runs as Ray tasks with per-worker-process
    # cached state (no pool spin-up per round — right for many small rounds);
    # "actors": explicit actor pool per round (state amortized per round —
    # right for few, very wide rounds at cluster scale)
    stage_mode: str = "tasks"
    max_depth: int | None = None            # None = crawl to exhaustion
    max_rounds: int = 10_000                # safety bound on BFS rounds

    # politeness: None -> release everything each round (reference results:
    # crawl_delay only slows the reference, never changes its output sets);
    # "robots" -> per-host budget of round_window/crawl_delay fetches/round;
    # int N -> at most N fetches per host per round.
    politeness_budget: int | str | None = None
    round_window_s: float = 60.0            # simulated wall-time of one round

    # seen-store mode: "exact" (python set per shard — conformance) or
    # "cuckoo" (approximate membership, ~2B/url at 1e10 scale — bench mode;
    # false positives drop URLs, rate reported in metrics)
    seen_mode: str = "exact"
    cuckoo_capacity: int = 1 << 20          # per-shard fingerprint slots

    checkpoint_dir: str | None = None       # None = no checkpointing
    checkpoint_every: int = 1               # rounds between checkpoints
    # rounds of checkpoint+manifest history retained (rollback window =
    # checkpoint_keep - 1 rounds); shard files and manifest_round_<r>.json
    # are pruned in lockstep so a manifest never names a deleted file
    checkpoint_keep: int = 2

    # fields that change WHAT the crawl computes (participate in the
    # checkpoint lineage hash). Execution knobs (max_rounds, batch_size,
    # concurrency, stage_mode, checkpoint cadence) don't — a resumed run may
    # retune them freely. num_shards is semantic: it keys the checkpoint
    # shard files and host ownership.
    _SEMANTIC_FIELDS = (
        "user_agent", "obey_robots", "check_head", "trim_query",
        "trim_fragment", "record_redirects", "allowed_mime_types", "headers",
        "strip_default_ports", "num_shards", "max_depth",
        "politeness_budget", "round_window_s", "seen_mode", "cuckoo_capacity",
    )

    def config_hash(self) -> str:
        d = asdict(self)
        payload = json.dumps(
            {k: d[k] for k in self._SEMANTIC_FIELDS}, sort_keys=True, default=str
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    def as_dict(self) -> dict:
        return asdict(self)
