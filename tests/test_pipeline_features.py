"""Pipeline feature tests: resume, politeness deferral, cuckoo mode,
config variants, determinism."""

import pytest

from raycrawl.config import CrawlConfig
from raycrawl.pipelines.crawl import crawl
from raycrawl.sources.synth import generate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("feat")
    return generate_corpus(str(out), n_hosts=3, pages_per_host=12, seed=21)


BASE = dict(num_shards=3, fetch_concurrency=2)


def test_determinism_two_runs(ray_session, corpus):
    a = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    b = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    assert a.done_urls() == b.done_urls()
    assert a.seen_urls() == b.seen_urls()
    assert a.depths() == b.depths()


def test_resume_from_checkpoint(ray_session, corpus, tmp_path):
    full = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))

    # killed run: stop after 2 rounds
    out1 = str(tmp_path / "run")
    cfg = CrawlConfig(**BASE, max_rounds=2)
    partial = crawl(corpus["corpus"], corpus["seeds"], cfg, output_dir=out1)
    assert partial.rounds == 2
    assert partial.done_urls() != full.done_urls()

    # resume (same semantic config -> same hash; max_rounds is an execution
    # knob excluded from the lineage hash) and run to exhaustion
    resumed = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE),
                    output_dir=out1, resume=True)
    assert resumed.rounds > 0

    # final state: union of all runs' done sets equals the uninterrupted run
    import pyarrow.dataset as pads

    tall = pads.dataset(f"{out1}/rounds", partitioning="hive").to_table()
    done = {
        u for u, k in zip(tall["url_norm"].to_pylist(), tall["kind"].to_pylist())
        if k == "done"
    }
    assert done == full.done_urls()


def test_rollback_resume_from_older_manifest(ray_session, corpus, tmp_path):
    """Crash consistency: resuming from an OLDER round's manifest (as if
    the latest checkpoint round had crashed half-written) replays the
    deterministic rounds and lands on the same final state."""
    import json
    import os
    import shutil

    full = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))

    out = str(tmp_path / "run")
    crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE, max_rounds=3),
          output_dir=out)
    # roll back: install round-1's manifest as the latest (round-2's shard
    # files may as well be the half-written casualties of a crash)
    shutil.copy(os.path.join(out, "manifest_round_1.json"),
                os.path.join(out, "manifest.json"))
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["round"] == 1

    resumed = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE),
                    output_dir=out, resume=True)
    assert resumed.rounds > 0

    import pyarrow.dataset as pads

    tall = pads.dataset(f"{out}/rounds", partitioning="hive").to_table()
    done = {
        u for u, k in zip(tall["url_norm"].to_pylist(), tall["kind"].to_pylist())
        if k == "done"
    }
    assert done == full.done_urls()


def test_shard_stats_reported(ray_session, corpus):
    res = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    assert len(res.shard_stats) == BASE["num_shards"]
    total_seen = sum(s["seen"] for s in res.shard_stats)
    assert total_seen == len(res.seen_urls())
    assert all(s["pending"] == 0 for s in res.shard_stats)

    ck = crawl(corpus["corpus"], corpus["seeds"],
               CrawlConfig(**BASE, seen_mode="cuckoo"))
    assert all("cuckoo_fp_rate" in s for s in ck.shard_stats)


def test_truncated_crawl_keeps_unfetched_rows_pending(ray_session, corpus):
    """A max_rounds-truncated crawl must not pop rows for the round it
    will never run: every row counted released was fetched in some round,
    and the un-run frontier stays visible in the pending counters."""
    res = crawl(corpus["corpus"], corpus["seeds"],
                CrawlConfig(**BASE, max_rounds=2))
    assert res.rounds == 2
    stats_released = sum(s["released"] for s in res.shard_stats)
    metric_released = sum(m["released"] for m in res.metrics)
    assert stats_released == metric_released
    assert sum(s["pending"] for s in res.shard_stats) > 0


def test_resume_rejects_config_change(ray_session, corpus, tmp_path):
    out = str(tmp_path / "run")
    crawl(corpus["corpus"], corpus["seeds"],
          CrawlConfig(**BASE, max_rounds=1), output_dir=out)
    with pytest.raises(ValueError, match="hash mismatch"):
        crawl(corpus["corpus"], corpus["seeds"],
              CrawlConfig(**BASE, max_rounds=1, trim_query=False),
              output_dir=out, resume=True)


def test_politeness_deferral_same_results_more_rounds(ray_session, corpus):
    fast = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    slow = crawl(corpus["corpus"], corpus["seeds"],
                 CrawlConfig(**BASE, politeness_budget=3))
    assert slow.rounds > fast.rounds
    assert slow.done_urls() == fast.done_urls()
    assert slow.seen_urls() == fast.seen_urls()
    assert slow.depths() == fast.depths()  # discovery depth, not fetch round


def test_politeness_auto_budget_same_results_bounded_rounds(
    ray_session, corpus
):
    """politeness_budget='auto:N': the largest-remainder allocator drives
    per-host release quotas from pending demand each round — same final
    sets as the unbudgeted crawl, every round's total release <= N (the
    in-crawl assertion also enforces this), more rounds."""
    free = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    auto = crawl(corpus["corpus"], corpus["seeds"],
                 CrawlConfig(**BASE, politeness_budget="auto:7"))
    assert auto.done_urls() == free.done_urls()
    assert auto.seen_urls() == free.seen_urls()
    assert auto.depths() == free.depths()
    assert auto.rounds > free.rounds
    assert all(m["released"] <= 7 for m in auto.metrics)
    # the budget is spent fully while demand exceeds it
    spent_full = [m["released"] for m in auto.metrics[:-1]]
    assert spent_full and max(spent_full) == 7


def test_hamilton_alloc_exact_and_deterministic():
    from raycrawl.state.frontier import hamilton_alloc

    d = {"a": 5, "b": 3, "c": 2}
    a = hamilton_alloc(d, 7)
    assert sum(a.values()) == 7
    # proportional within one slot of the real share
    for h, n in d.items():
        assert abs(a[h] - 7 * n / 10) < 1
    # ties: equal demand -> remainder ties broken host ASC
    t = hamilton_alloc({"x": 1, "y": 1, "z": 1}, 2)
    assert t == {"x": 1, "y": 1, "z": 0}
    assert hamilton_alloc({}, 5) == {}
    assert hamilton_alloc({"a": 1}, 0) == {}
    # budget > demand: over-allocation pro rata, still sums to budget
    big = hamilton_alloc({"a": 1, "b": 1}, 10)
    assert sum(big.values()) == 10


def test_politeness_robots_budget(ray_session, tmp_path):
    info = generate_corpus(str(tmp_path), n_hosts=2, pages_per_host=10,
                           crawl_delays={"h0.example.com": 30}, seed=5)
    free = crawl(info["corpus"], info["seeds"], CrawlConfig(**BASE))
    # round_window 60s, crawl_delay 30s -> budget 2 fetches/round for h0
    polite = crawl(info["corpus"], info["seeds"],
                   CrawlConfig(**BASE, politeness_budget="robots",
                               round_window_s=60.0))
    assert polite.done_urls() == free.done_urls()
    assert polite.seen_urls() == free.seen_urls()
    # h0's done pages at 2/round force more rounds than the free run
    assert polite.rounds > free.rounds
    h0_released_per_round = [
        m["released"] for m in polite.metrics
    ]
    assert max(h0_released_per_round) <= 2 + 20  # h1 unconstrained


def test_cuckoo_mode_matches_exact(ray_session, corpus):
    exact = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    approx = crawl(corpus["corpus"], corpus["seeds"],
                   CrawlConfig(**BASE, seen_mode="cuckoo",
                               cuckoo_capacity=1 << 16))
    # at this scale the FP probability is ~1e-4 — sets should match
    assert approx.done_urls() == exact.done_urls()


def test_trim_query_false_variant(ray_session, corpus):
    res = crawl(corpus["corpus"], corpus["seeds"],
                CrawlConfig(**BASE, trim_query=False, trim_fragment=False))
    # ?with=query urls survive the pipeline and 404 (not in corpus)
    assert any("with=query" in u for u in res.seen_urls())
    assert not any("with=query" in u for u in res.done_urls())
    assert any("#" not in u for u in res.seen_urls())


def test_check_head_skips_wrong_mime_bodies(ray_session, corpus):
    """check_head=True is the HEAD-before-GET gate: identical routing (same
    done set), but wrong-mime done rows never carry a body (text null)."""
    import pyarrow.compute as pc

    plain = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    head = crawl(corpus["corpus"], corpus["seeds"],
                 CrawlConfig(**BASE, check_head=True))
    assert head.done_urls() == plain.done_urls()

    done = head.done_table()
    nonhtml = done.filter(
        pc.invert(pc.match_substring(done["content_type"], "text/html"))
    )
    assert nonhtml.num_rows > 0  # corpus includes pdf/png/css pages
    assert nonhtml["text"].null_count == nonhtml.num_rows
    # html pages still carry their extracted text
    html = done.filter(pc.match_substring(done["content_type"], "text/html"))
    assert html["text"].null_count == 0


def test_check_head_prunes_body_io(ray_session, corpus):
    """Under check_head a batch of only wrong-mime urls must never read
    the html/text columns from the corpus — the bucket table loaded for
    those lookups is url-only (the HEAD gate's whole point is avoiding
    the body transfer, reference requester.py:81-105)."""
    import pyarrow as pa

    from raycrawl.sources.synth import N_BUCKETS_DEFAULT
    from raycrawl.stages import fetchsim
    from raycrawl.stages.fetchsim import FetchSimulator

    fetchsim._BUCKET_CACHE.clear()
    sim = FetchSimulator(corpus["corpus"], N_BUCKETS_DEFAULT, check_head=True)
    urls = [f"http://h{i}.example.com/{p}" for i in range(3)
            for p in ("doc1.pdf", "img1.png", "style.css")]
    batch = pa.table({
        "url_norm": pa.array(urls),
        "host": pa.array([u.split("//")[1].split("/")[0] for u in urls]),
    })
    out = sim(batch)
    assert out.num_rows == len(urls)
    assert set(out["status"].to_pylist()) == {200}
    assert out["text"].null_count == out.num_rows
    # every bucket table the batch touched was the url-only pruned read
    assert fetchsim._BUCKET_CACHE, "lookup must have populated the cache"
    for (_, _, _, with_body), (tbl, _idx) in fetchsim._BUCKET_CACHE.items():
        assert with_body is False
        assert tbl.column_names == ["url"]
    fetchsim._BUCKET_CACHE.clear()


def test_lookup_rows_matches_dict_probe():
    """The shared sorted-hash url index must agree with a plain dict probe
    on hits, misses, and empty edges (it replaced the per-worker dict)."""
    import pyarrow as pa

    from raycrawl.stages.fetchsim import build_url_index, lookup_rows

    urls = [f"http://h{i % 7}.example.com/p{i}" for i in range(997)]
    col = pa.chunked_array([urls[:400], urls[400:]]).combine_chunks()
    index = build_url_index(col)
    ref = {u: i for i, u in enumerate(urls)}
    queries = urls[::13] + [u + "x" for u in urls[::29]] + ["", "http://absent/"]
    got = lookup_rows(queries, index, col)
    assert got.tolist() == [ref.get(q, -1) for q in queries]
    # empty edges
    assert lookup_rows([], index, col).tolist() == []
    empty = pa.array([], pa.string())
    assert lookup_rows(["http://x/"], build_url_index(empty), empty).tolist() == [-1]


def test_lookup_rows_walks_hash_collision_runs():
    """A 64-bit hash collision must resolve to the CORRECT row or -1,
    never a wrong row (byte-parity depends on it). Forced by doctoring an
    index so every slot carries the query's hash: the probe's equality
    check fails on the first candidate and walks the equal-hash run."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    from raycrawl.stages.fetchsim import _HASH_SEED, lookup_rows

    urls = pa.array(["http://a/", "http://b/", "http://c/"])
    h_b = pl.Series(["http://b/"]).hash(seed=_HASH_SEED).to_numpy()[0]
    doctored = (np.array([h_b] * 3, dtype=np.uint64),
                np.array([0, 1, 2], dtype=np.int64))
    # hash hit at pos 0 -> url mismatch -> walk finds row 1
    assert lookup_rows(["http://b/"], doctored, urls).tolist() == [1]
    # colliding hash but the url is in no slot -> -1, never a wrong row
    doctored_absent = (np.array([h_b] * 3, dtype=np.uint64),
                       np.array([0, 2, 0], dtype=np.int64))
    assert lookup_rows(["http://b/"], doctored_absent, urls).tolist() == [-1]


def test_max_depth(ray_session, corpus):
    res = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE, max_depth=1))
    assert res.depths() and max(res.depths().values()) <= 1


def test_output_dir_rounds_parquet_driver_clean(ray_session, corpus, tmp_path):
    """collect=False is the at-scale path: the driver holds NO round rows
    (no tall table, no done/seen snapshots) — the rounds Parquet is the
    complete, authoritative record and shard_stats carry the counts."""
    out = str(tmp_path / "o")
    res = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE),
                output_dir=out, collect=False)
    assert res.tall is None          # no edge row ever landed on the driver
    assert res.done is None and res.seen is None  # snapshots gated too

    import pyarrow.dataset as pads

    tall = pads.dataset(f"{out}/rounds", partitioning="hive").to_table()
    done = {
        u for u, k in zip(tall["url_norm"].to_pylist(), tall["kind"].to_pylist())
        if k == "done"
    }
    ref = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    # rounds-Parquet completeness vs a collected run
    assert done == ref.done_urls()
    assert tall.num_rows == ref.tall.num_rows
    # shard_stats counters are the scale-mode observability surface
    assert sum(s["done"] for s in res.shard_stats) == len(done)


def test_ingest_jsonl_crawl_parity(ray_session, corpus, tmp_path):
    """A JSONL archive ingested through sources.ingest crawls to the
    IDENTICAL done/seen sets as the native parquet corpus — source
    format must not change engine results."""
    import json
    import os

    import pyarrow.dataset as pads

    from raycrawl.sources.ingest import ingest_corpus

    src = pads.dataset(corpus["corpus"], partitioning="hive").to_table()
    jl = str(tmp_path / "archive.jsonl")
    with open(jl, "w") as f:
        for i in range(src.num_rows):
            f.write(json.dumps({
                "url": src["url"][i].as_py(),
                "warc_ts": src["warc_ts"][i].value,      # epoch us int
                "html": bytes(src["html"][i].as_py()).decode("utf-8"),
                "text": src["text"][i].as_py(),
                "lang": src["lang"][i].as_py(),
            }) + "\n")

    info = ingest_corpus(jl, str(tmp_path / "ing"))
    assert info["n_rows"] == src.num_rows

    ref = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    got = crawl(info["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    assert got.done_urls() == ref.done_urls()
    assert got.seen_urls() == ref.seen_urls()


def test_ingest_csv_defaults(ray_session, tmp_path):
    """CSV archives (url+text only) ingest with defaulted html/lang/ts
    and land in the right host buckets."""
    import csv

    import pyarrow.dataset as pads

    from raycrawl.sources.ingest import ingest_corpus
    from raycrawl.sources.synth import host_bucket

    p = str(tmp_path / "a.csv")
    rows = [(f"http://h{i}.example.com/p", f"text {i}") for i in range(6)]
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "text"])
        w.writerows(rows)

    info = ingest_corpus(p, str(tmp_path / "out"), n_buckets=4)
    assert info["n_rows"] == 6
    t = pads.dataset(info["corpus"], partitioning="hive").to_table()
    got = dict(zip(t["url"].to_pylist(), t["bucket"].to_pylist()))
    for u, _ in rows:
        host = u.split("://")[1].split("/")[0]
        assert got[u] == host_bucket(host, 4)
    assert set(t["html"].to_pylist()) == {b""}
    assert set(t["lang"].to_pylist()) == {""}


def test_warc_roundtrip_bytes():
    """Writer -> parser round-trip is bit-exact (incl. binary payloads
    with embedded CRLFCRLF and gzip), and non-response records skip."""
    from raycrawl.sources.warc import (format_warc_record, parse_warc,
                                       write_warc)

    body = b"<html>\r\n\r\nbinary\x00payload</html>"
    recs = [
        {"url": "http://a.example.com/", "warc_ts": 1_700_000_000_000_000,
         "html": body, "status": 301, "mime": "text/html; charset=utf-8"},
        {"url": "http://b.example.com/x", "warc_ts": 0, "html": b""},
    ]
    raw = b"".join(
        format_warc_record(r["url"], r["warc_ts"], r["html"],
                           r.get("status", 200),
                           r.get("mime", "text/html"))
        for r in recs
    )
    # splice in a request record the reader must skip
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"Content-Length: 4\r\n\r\nGET \r\n\r\n")
    got = parse_warc(req + raw)
    assert [g["url"] for g in got] == [r["url"] for r in recs]
    assert got[0]["html"] == body
    assert got[0]["status"] == 301
    assert got[0]["mime"] == "text/html; charset=utf-8"
    assert got[0]["warc_ts"] == recs[0]["warc_ts"]
    assert got[1]["html"] == b""

    import gzip as _gz

    assert parse_warc(_gz.compress(raw)) == parse_warc(raw)

    # file writer round-trip
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/x.warc.gz"
        assert write_warc(recs, p) == 2
        with open(p, "rb") as f:
            assert parse_warc(f.read()) == parse_warc(raw)


def test_ingest_warc_crawl_parity(ray_session, corpus, tmp_path):
    """A WARC archive (Common Crawl's container) ingested through
    sources.ingest crawls to IDENTICAL done/seen sets as the native
    parquet corpus — same bar as the JSONL/CSV formats."""
    import pyarrow.dataset as pads

    from raycrawl.sources.ingest import ingest_corpus
    from raycrawl.sources.warc import write_warc

    src = pads.dataset(corpus["corpus"], partitioning="hive").to_table()
    rows = [
        {"url": src["url"][i].as_py(),
         "warc_ts": src["warc_ts"][i].value,
         "html": src["html"][i].as_py(),
         # a real crawl export records robots.txt as text/plain — the
         # reader must route it into the text column the robots cache reads
         "mime": ("text/plain"
                  if src["url"][i].as_py().endswith("/robots.txt")
                  else "text/html")}
        for i in range(src.num_rows)
    ]
    # two shard files, one gzipped — exercises the per-file task split
    mid = len(rows) // 2
    d = tmp_path / "warcs"
    d.mkdir()
    write_warc(rows[:mid], str(d / "shard-00.warc"))
    write_warc(rows[mid:], str(d / "shard-01.warc.gz"))

    info = ingest_corpus(str(d), str(tmp_path / "ing"))
    assert info["n_rows"] == src.num_rows

    ref = crawl(corpus["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    got = crawl(info["corpus"], corpus["seeds"], CrawlConfig(**BASE))
    assert got.done_urls() == ref.done_urls()
    assert got.seen_urls() == ref.seen_urls()


def test_export_warc_roundtrip_and_resume(ray_session, corpus, tmp_path):
    """Corpus -> WARC export -> re-ingest reproduces url/ts/html exactly;
    a second export run skips every committed archive."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from raycrawl.pipelines.sink import export_warc
    from raycrawl.sources.ingest import ingest_corpus

    pattern = corpus["corpus"] + "/bucket=*/*.parquet"
    out = str(tmp_path / "warcs")
    info = export_warc(pattern, out)
    src = pads.dataset(corpus["corpus"], partitioning="hive").to_table()
    assert info["records"] == src.num_rows
    assert info["skipped"] == 0
    n_archives = len(_glob.glob(out + "/*.warc.gz"))
    assert n_archives == info["archives"]

    # resume: everything committed -> nothing re-exported
    again = export_warc(pattern, out)
    assert again["skipped"] == again["archives"] == n_archives
    assert again["records"] == 0

    # round-trip: re-ingest and compare url/ts/html row sets
    ing = ingest_corpus(out, str(tmp_path / "reing"))
    assert ing["n_rows"] == src.num_rows
    back = pads.dataset(ing["corpus"], partitioning="hive").to_table()

    def key_set(t):
        ts = t["warc_ts"]
        if not pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        return {
            (u, v, bytes(h))
            for u, v, h in zip(t["url"].to_pylist(),
                               pc.cast(ts, pa.int64()).to_pylist(),
                               t["html"].to_pylist())
        }

    import pyarrow as pa

    assert key_set(back) == key_set(src)


def test_warc_parser_fuzz_roundtrip():
    """Hypothesis fuzz: arbitrary records (binary bodies incl. CRLF/NUL
    runs, odd mimes, zero-length) survive write->parse bit-exactly, and
    arbitrary garbage prefixes/suffixes never crash the walker."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raycrawl.sources.warc import format_warc_record, parse_warc

    rec = st.fixed_dictionaries({
        "url": st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=40,
        ).map(lambda p: "http://h.example.com/" + p),
        "warc_ts": st.integers(min_value=0, max_value=4_000_000_000_000_000),
        "html": st.binary(max_size=300),
        "status": st.integers(min_value=100, max_value=599),
        "mime": st.sampled_from(
            ["text/html", "text/plain", "application/octet-stream",
             "text/html; charset=utf-8"]
        ),
    })

    @settings(max_examples=60, deadline=None)
    @given(st.lists(rec, max_size=5), st.binary(max_size=30))
    def run(records, junk):
        raw = b"".join(
            format_warc_record(r["url"], r["warc_ts"], r["html"],
                               r["status"], r["mime"])
            for r in records
        )
        got = parse_warc(raw)
        assert len(got) == len(records)
        for g, r in zip(got, records):
            assert g["url"] == r["url"]
            assert g["warc_ts"] == r["warc_ts"]
            assert g["html"] == r["html"]
            assert g["status"] == r["status"]
            assert g["mime"] == r["mime"]
        # garbage SUFFIX: parsed prefix records stay intact, no crash
        got2 = parse_warc(raw + junk)
        assert got2[: len(records)] == got
        # pure garbage: never raises
        parse_warc(junk)

    run()
