"""Randomized multi-config conformance sweep (no HTTP): our pipeline vs the
mini-BFS oracle built on the REFERENCE's own parser/linkflow components,
across varied corpus shapes and crawl configs."""

import pytest

from raycrawl.config import CrawlConfig
from raycrawl.pipelines.crawl import crawl
from raycrawl.sources.synth import generate_corpus

from tests.ref_harness import load_corpus_dict, reference_bfs_depths

pytest.importorskip("simple_crawler")

CASES = [
    # (seed, n_hosts, pages, links, flags, config-kwargs)
    (101, 2, 18, 5, dict(relative_links=False), {}),
    (202, 1, 30, 9, dict(relative_links=True, redirect_links=False), {}),
    (303, 3, 12, 7, dict(relative_links=False), dict(num_shards=5)),
    (404, 2, 20, 6, dict(relative_links=False),
     dict(trim_query=False, trim_fragment=False)),
    (505, 2, 16, 6, dict(relative_links=True, redirect_links=False),
     dict(seen_mode="cuckoo")),
]


@pytest.mark.parametrize("seed,n_hosts,pages,links,flags,cfg", CASES)
def test_sweep_matches_reference_bfs(
    ray_session, tmp_path, seed, n_hosts, pages, links, flags, cfg
):
    info = generate_corpus(
        str(tmp_path), n_hosts=n_hosts, pages_per_host=pages,
        links_per_page=links, seed=seed, **flags,
    )
    cd = load_corpus_dict(info["corpus"])

    config = CrawlConfig(**{"num_shards": 3, "fetch_concurrency": 2, **cfg})
    res = crawl(info["corpus"], info["seeds"], config)

    # oracle per host-seed (the mini-BFS replays one seed at a time)
    done, seen, depths = set(), set(), {}
    for i in range(n_hosts):
        o = reference_bfs_depths(
            cd, f"http://h{i}.example.com/",
            trim_query=config.trim_query, trim_fragment=config.trim_fragment,
        )
        done |= o["done"]
        seen |= o["seen"]
        for u, d in o["depths"].items():
            depths[u] = min(d, depths.get(u, d))

    assert res.done_urls() == done, (seed, cfg)
    if config.seen_mode == "exact":
        assert res.seen_urls() == seen, (seed, cfg)
    ours_depths = res.depths()
    golden = {u: d for u, d in depths.items() if u in done}
    assert ours_depths == golden, (seed, cfg)
