"""CLI — parity with the reference's click command (cli.py:17-59) plus the
corpus/engine knobs. Run as ``python -m raycrawl.cli crawl <seed> --corpus
<dir>`` (or via ``ray job submit -- python -m raycrawl.cli ...``).

``--debug`` prints the resolved config without crawling, exactly like the
reference's debug short-circuit (cli.py:49-59).
"""

from __future__ import annotations

import argparse
import sys

from raycrawl.config import DEFAULT_USER_AGENT, CrawlConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="raycrawl")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="BFS-crawl a parquet corpus from seed URLs")
    c.add_argument("seeds", nargs="+", help="seed URL(s) or a seeds.parquet path")
    c.add_argument("--corpus", required=True, help="corpus parquet directory")
    c.add_argument("-u", "--user-agent", default=DEFAULT_USER_AGENT)
    c.add_argument("-d", "--disobey-robots", action="store_true")
    c.add_argument("-h2", "--check-head", action="store_true")
    c.add_argument("-wq", "--with-query", action="store_true")
    c.add_argument("-wf", "--with-fragment", action="store_true")
    c.add_argument("--num-shards", type=int, default=4)
    c.add_argument("--fetch-concurrency", type=int, default=4)
    c.add_argument("--max-depth", type=int, default=None)
    c.add_argument("--politeness", default=None,
                   help="'robots' | integer fetches/host/round | default none")
    c.add_argument("--seen-mode", choices=["exact", "cuckoo"], default="exact")
    c.add_argument("--output-dir", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--debug", action="store_true",
                   help="print config and exit without crawling")

    i = sub.add_parser(
        "ingest",
        help="normalize a JSONL/CSV/Parquet/WARC crawl archive into the "
             "bucketed corpus layout crawl expects",
    )
    i.add_argument("input", help="archive file or directory")
    i.add_argument("--out", required=True, help="output directory")
    i.add_argument("--buckets", type=int, default=8)

    s = sub.add_parser("synth", help="generate a synthetic corpus")
    s.add_argument("--out", required=True)
    s.add_argument("--hosts", type=int, default=4)
    s.add_argument("--pages", type=int, default=64)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--skew", type=float, default=0.0)

    q = sub.add_parser(
        "query",
        help="run a named operator pipeline over a table dir; write Parquet",
    )
    q.add_argument("name", help="queries() entry name, or 'list'")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="directory holding the parquet tables")
    q.add_argument("--out", default=None,
                   help="output directory (partitioned Parquet; omitted = "
                        "print row count + head)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.cmd == "synth":
        from raycrawl.sources.synth import generate_corpus

        info = generate_corpus(args.out, n_hosts=args.hosts,
                               pages_per_host=args.pages, seed=args.seed,
                               skew_host_frac=args.skew)
        print(f"corpus: {info['corpus']} ({info['n_rows']} rows)")
        print(f"seeds:  {info['seeds']}")
        return 0

    if args.cmd == "ingest":
        import ray

        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from raycrawl.sources.ingest import ingest_corpus

        info = ingest_corpus(args.input, args.out, n_buckets=args.buckets)
        print(f"corpus: {info['corpus']} ({info['n_rows']} rows, "
              f"{info['n_buckets']} buckets)")
        if owns:
            ray.shutdown()
        return 0

    if args.cmd == "query":
        return _run_query(args)

    politeness = args.politeness
    if politeness is not None and politeness != "robots":
        try:
            politeness = int(politeness)
        except ValueError:
            build_parser().error(
                f"--politeness must be 'robots' or an integer, got {politeness!r}"
            )
    config = CrawlConfig(
        user_agent=args.user_agent,
        obey_robots=not args.disobey_robots,
        check_head=args.check_head,
        trim_query=not args.with_query,
        trim_fragment=not args.with_fragment,
        num_shards=args.num_shards,
        fetch_concurrency=args.fetch_concurrency,
        max_depth=args.max_depth,
        politeness_budget=politeness,
        seen_mode=args.seen_mode,
    )

    if args.debug:
        print("debug mode is on: crawling not running")
        for k, v in config.as_dict().items():
            print(f"{k.replace('_', ' ')}: {v}")
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycrawl.pipelines.crawl import crawl

    seeds = args.seeds[0] if (
        len(args.seeds) == 1 and args.seeds[0].endswith(".parquet")
    ) else args.seeds
    res = crawl(args.corpus, seeds, config, output_dir=args.output_dir,
                resume=args.resume)
    print(f"WHEN CRAWLING: {args.seeds} THE CRAWLER FOUND:")
    for url in sorted(res.done_urls()):
        print(f"FOUND: {url}")
    print(f"rounds={res.rounds} done={len(res.done_urls())} "
          f"seen={len(res.seen_urls() or [])}")
    if owns_session:  # never tear down a caller's Ray session
        ray.shutdown()
    return 0


def _run_query(args) -> int:
    """Run one queries() pipeline; sink = partitioned Parquet (the
    resumable at-scale output shape: workers write their own part files,
    nothing funnels through the driver)."""
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.name == "list":
        for name in qs:
            print(name)
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see 'query list'", file=sys.stderr)
        return 2

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    res = qs[args.name](args.sf_dir)
    if args.out:
        if isinstance(res, pd.DataFrame):
            res = rd.from_pandas(res)
        elif isinstance(res, pa.Table):
            res = rd.from_arrow(res)
        res.write_parquet(args.out)
        print(f"wrote {args.name} to {args.out}")
    else:
        if isinstance(res, rd.Dataset):
            n = res.count()
            head = res.limit(5).to_pandas()
        else:
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            n, head = len(df), df.head(5)
        print(f"{args.name}: {n} rows")
        print(head.to_string(index=False))
    if owns_session:  # never tear down a caller's Ray session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
