"""Unit tests: cuckoo filter, frontier shard protocol, robots cache."""

import pytest

from raycrawl.state.cuckoo import CuckooFilter, url_hash64


def test_cuckoo_basic_membership():
    f = CuckooFilter(10_000, seed=1)
    keys = [url_hash64(f"http://h/p{i}") for i in range(5_000)]
    for k in keys:
        f.add_hash(k)
    assert all(f.contains_hash(k) for k in keys)  # no false negatives, ever


def test_cuckoo_false_positive_rate():
    f = CuckooFilter(100_000, seed=2)
    ins = [url_hash64(f"http://a/{i}") for i in range(50_000)]
    for k in ins:
        f.add_hash(k)
    probe = [url_hash64(f"http://b/{i}") for i in range(50_000)]
    fp = sum(f.contains_hash(k) for k in probe)
    # 4-slot x 16-bit theoretical ~2*4/2^16 ≈ 0.00012/bucket pair; allow slack
    assert fp / len(probe) < 0.01


def test_cuckoo_check_and_add_first_wins():
    f = CuckooFilter(1000, seed=3)
    hs = [url_hash64("u1"), url_hash64("u2"), url_hash64("u1")]
    mask = f.check_and_add_hashes(hs)
    assert mask.tolist() == [True, True, False]


def test_cuckoo_checkpoint_roundtrip():
    f = CuckooFilter(5000, seed=4)
    keys = [url_hash64(f"k{i}") for i in range(3000)]
    for k in keys:
        f.add_hash(k)
    g = CuckooFilter.from_state(f.to_state())
    assert g.size == f.size
    assert all(g.contains_hash(k) for k in keys)
    # deterministic continued behavior after restore
    more = [url_hash64(f"m{i}") for i in range(100)]
    assert f.check_and_add_hashes(more).tolist() == g.check_and_add_hashes(more).tolist()


def test_cuckoo_overflow_keeps_correctness():
    f = CuckooFilter(64, seed=5)
    keys = [url_hash64(f"x{i}") for i in range(1000)]  # way over capacity
    for k in keys:
        f.add_hash(k)
    assert all(f.contains_hash(k) for k in keys)
    assert len(f.overflow) > 0


@pytest.fixture()
def shard(ray_session):
    import ray

    from raycrawl.state.frontier import FrontierShard

    s = FrontierShard.remote(0, seen_mode="exact")
    yield s, ray
    ray.kill(s)


def test_frontier_offer_commit_release(shard):
    s, ray = shard
    rows = [
        ("http://h/b", "http://h/b", "h", 1),
        ("http://h/a", "http://h/a", "h", 1),
        ("http://h/b?", "http://h/b", "h", 1),  # dup norm, different raw
    ]
    ray.get(s.offer_buffer.remote(rows))
    assert ray.get(s.commit_round.remote()) == 2
    tbl = ray.get(s.release_table.remote(None, None))
    # deterministic order: (depth, url_norm); min-raw representative for b
    assert tbl["url_norm"].to_pylist() == ["http://h/a", "http://h/b"]
    assert tbl["url_raw"].to_pylist() == ["http://h/a", "http://h/b"]
    assert ray.get(s.last_release_count.remote()) == 2
    # re-offer after seen: dropped
    ray.get(s.offer_buffer.remote(rows))
    assert ray.get(s.commit_round.remote()) == 0


def test_frontier_done_blocks_enqueue_but_not_seen(shard):
    s, ray = shard
    ray.get(s.mark_done.remote(["http://h/seed"]))
    ray.get(s.offer_buffer.remote([("http://h/seed", "http://h/seed", "h", 2)]))
    assert ray.get(s.commit_round.remote()) == 0   # not enqueued
    assert "http://h/seed" in ray.get(s.seen_snapshot.remote())  # but seen


def test_frontier_politeness_budget(shard):
    s, ray = shard
    rows = [(f"http://h/{i}", f"http://h/{i}", "h", 1) for i in range(10)]
    rows += [(f"http://g/{i}", f"http://g/{i}", "g", 1) for i in range(3)]
    ray.get(s.offer_buffer.remote(rows))
    ray.get(s.commit_round.remote())
    t1 = ray.get(s.release_table.remote({"h": 4}, None))
    hosts = t1["host"].to_pylist()
    assert hosts.count("h") == 4 and hosts.count("g") == 3  # g unlimited
    assert ray.get(s.pending_count.remote()) == 6
    t2 = ray.get(s.release_table.remote({"h": 4}, None))
    assert t2.num_rows == 4
    t3 = ray.get(s.release_table.remote(None, None))
    assert t3.num_rows == 2
    assert ray.get(s.pending_count.remote()) == 0


def test_frontier_checkpoint_restore(shard, tmp_path):
    s, ray = shard
    from raycrawl.state.frontier import FrontierShard

    ray.get(s.offer_buffer.remote([(f"http://h/{i}", f"http://h/{i}", "h", 1) for i in range(5)]))
    ray.get(s.commit_round.remote())
    ray.get(s.mark_done.remote(["http://h/0"]))
    info = ray.get(s.checkpoint.remote(str(tmp_path), 3))
    assert info["round"] == 3 and "shard_0_round_3.pkl" in info["path"]

    s2 = FrontierShard.remote(0, seen_mode="exact")
    # restore by exact path (what the manifest does) and by directory
    assert ray.get(s2.restore.remote(info["path"])) == 3
    assert ray.get(s2.seen_snapshot.remote()) == ray.get(s.seen_snapshot.remote())
    assert ray.get(s2.done_snapshot.remote()) == ray.get(s.done_snapshot.remote())
    a = ray.get(s.release_table.remote(None, None))
    b = ray.get(s2.release_table.remote(None, None))
    assert a.equals(b)
    s3 = FrontierShard.remote(0, seen_mode="exact")
    assert ray.get(s3.restore.remote(str(tmp_path))) == 3
    ray.kill(s2)
    ray.kill(s3)


def test_frontier_checkpoint_retention(shard, tmp_path):
    s, ray = shard
    import os

    for r in range(5):
        ray.get(s.checkpoint.remote(str(tmp_path), r, 2))
    files = sorted(os.listdir(str(tmp_path)))
    assert files == ["shard_0_round_3.pkl", "shard_0_round_4.pkl"]


def test_robots_rules_parsing(ray_session, tmp_path):
    import ray

    from raycrawl.sources.synth import generate_corpus
    from raycrawl.state.robots import RobotsCache, RulesView

    info = generate_corpus(str(tmp_path), n_hosts=1, pages_per_host=4,
                           crawl_delays={"h0.example.com": 5}, seed=3)
    cache = RobotsCache.remote(info["corpus"])
    view = RulesView(cache)
    assert view.allowed("RayCrawl", "h0.example.com", "http://h0.example.com/p1")
    assert not view.allowed("RayCrawl", "h0.example.com", "http://h0.example.com/private/x0")
    assert not view.allowed("EvilBot", "h0.example.com", "http://h0.example.com/p1")
    # unknown host -> allow-all (parse empty, crawler.py:186-192)
    assert view.allowed("RayCrawl", "nosuch.example.com", "http://nosuch.example.com/x")
    assert view.delay("RayCrawl", "h0.example.com") == 5
    assert ray.get(cache.delays.remote("RayCrawl", ["h0.example.com"])) == {"h0.example.com": 5}
    ray.kill(cache)


def test_gate_round_duplicate_norms_both_modes(ray_session):
    """The filter-first gate probes BEFORE picking the per-norm
    representative: every row of a fresh norm must survive to the
    min-(depth,url_raw) pick — including in cuckoo mode, where the unique
    hashes are probed and the verdict fans back to rows via the inverse
    index. Exact and cuckoo must emit identical tables."""
    import pyarrow as pa
    import ray

    from raycrawl.state.cuckoo import url_hash64
    from raycrawl.state.frontier import FrontierShard

    def cand_tbl(rows):
        # rows: (url_raw, url_norm, host, depth)
        return pa.table(
            {
                "url_raw": pa.array([r[0] for r in rows], pa.string()),
                "url_norm": pa.array([r[1] for r in rows], pa.string()),
                "host": pa.array([r[2] for r in rows], pa.string()),
                "depth": pa.array([r[3] for r in rows], pa.int32()),
                "gshard": pa.array(
                    [url_hash64(r[1]) % 1 for r in rows], pa.int32()
                ),
            }
        )

    # duplicate norms with different (depth, raw): arrival order scrambled
    rows = [
        ("http://h/x?b", "http://h/x", "h", 3),
        ("http://h/y", "http://h/y", "h", 2),
        ("http://h/x?a", "http://h/x", "h", 2),   # the winner for x
        ("http://h/x?c", "http://h/x", "h", 2),
        ("http://h/z", "http://h/z", "h", 1),
    ]
    outs = {}
    for mode in ("exact", "cuckoo"):
        s = FrontierShard.remote(0, seen_mode=mode)
        out = ray.get(s.gate_round.remote(cand_tbl(rows), None, 1))
        # second round: same norms again -> all seen, nothing out
        out2 = ray.get(s.gate_round.remote(cand_tbl(rows), None, 1))
        assert out2.num_rows == 0, mode
        ray.kill(s)
        outs[mode] = out

    for mode, out in outs.items():
        assert out["url_norm"].to_pylist() == [
            "http://h/z", "http://h/x", "http://h/y"
        ], mode  # (depth, url_norm) output order
        assert out["url_raw"].to_pylist() == [
            "http://h/z", "http://h/x?a", "http://h/y"
        ], mode  # min-(depth, url_raw) representative, not first arrival
    assert outs["exact"].equals(outs["cuckoo"])
