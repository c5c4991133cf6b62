"""Deterministic Common-Crawl-style corpus synthesis (FIXTURES.md §1).

Generates the engine's primary input: a Parquet table of web pages with the
BASELINE.json ``input_hint`` schema
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
laid out host-hash-partitioned (``bucket=<b>/part-*.parquet``) so the fetch
simulator can prune at the read.

Page shapes mirror the reference's own test-page builders
(/root/reference/tests/conftest.py:13-30): ``<html><head></head><body>...``
with ``<a href="{p}">another link</a>`` tags joined by ``<br>``. The site
graph per host is a binary tree over pages (guaranteed reachability from the
root seed, BFS depth ~log2 n) plus a seeded mix of link styles covering the
reference's trim/join/filter semantics: relative, dot-relative, same-host
absolute, off-site absolute (filtered), query/fragment variants, duplicates,
self/seed backlinks (exercising the seen==done termination path,
crawler.py:206-210), error pages, non-html mime pages, and redirects.

The ``text`` column is the golden extraction (sorted newline-joined
normalized hrefs — byte-identical-invariant surface); it is produced by OUR
extractor, which tests prove byte-equal to the reference parser+normalizer.

Everything is keyed by an explicit ``seed`` — no wall clock, no global RNG.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl.functions.extract import page_text

__all__ = [
    "host_bucket",
    "N_BUCKETS_DEFAULT",
    "generate_corpus",
    "corpus_schema",
    "page_html",
]

N_BUCKETS_DEFAULT = 8

EPOCH = datetime.datetime(2026, 1, 1, 0, 0, 0)


def host_bucket(host: str, n_buckets: int) -> int:
    """Stable host -> partition bucket (blake2b, not PYTHONHASHSEED-dependent).

    ``host`` is the bare hostname (no port): callers must strip ports so
    that e.g. ``127.0.0.1:9999`` pages land in the ``127.0.0.1`` bucket.
    """
    host = host.rsplit(":", 1)[0] if ":" in host else host
    return int.from_bytes(hashlib.blake2b(host.encode(), digest_size=8).digest(), "big") % n_buckets


def corpus_schema() -> pa.Schema:
    return pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )


def page_html(hrefs) -> str:
    """Reference-shaped page markup (tests/conftest.py:13-25)."""
    tags = "<br>".join(f'<a href="{h}">another link</a>' for h in hrefs)
    return f"<html><head></head><body>{tags}</body></html>"


def _page_path(j: int) -> str:
    return "/" if j == 0 else f"/p{j}"


def _links_for_page(rng: random.Random, j: int, n_pages: int, links_per_page: int,
                    host: str, relative_links: bool = True,
                    redirect_links: bool = True):
    """Seeded link mix for page j of a host. Binary-tree children guarantee
    reachability; extras exercise the canonicalizer/filter matrix.

    relative_links=False restricts the grammar to join-base-independent
    forms (absolute paths / absolute urls) so a SQL BFS oracle over the
    ``text`` column can model the crawl exactly; raw-form join semantics
    stay covered by the unit + HTTP-conformance suites."""
    links = []
    for child in (2 * j + 1, 2 * j + 2):
        if child < n_pages:
            links.append(_page_path(child))

    styles = [
        lambda t: _page_path(t),                      # absolute path
        lambda t: _page_path(t) + "?with=query",
        lambda t: _page_path(t) + "#frag",
        lambda t: _page_path(t) + "?a=1#f",
        lambda t: f"http://{host}{_page_path(t)}",    # same-host absolute
    ]
    if relative_links:
        styles += [
            lambda t: _page_path(t).lstrip("/") or "/",   # relative
            lambda t: "./" + (_page_path(t).lstrip("/") or ""),
        ]
    n_extra = max(0, links_per_page - len(links))
    for _ in range(n_extra):
        roll = rng.random()
        if roll < 0.55:
            t = rng.randrange(n_pages)
            links.append(rng.choice(styles)(t))
        elif roll < 0.65:
            links.append("/")                          # seed backlink
        elif roll < 0.72:
            links.append(_page_path(j))                # self link
        elif roll < 0.80:
            links.append(f"http://offsite-{rng.randrange(3)}.example.net/x")
        elif roll < 0.86:
            links.append(f"/error/{rng.choice([403, 404, 500, 503])}")
        elif roll < 0.93 or not redirect_links:
            links.append(rng.choice(["/doc1.pdf", "/img1.png", "/style.css"]))
        else:
            # NB combining redirect pages WITH relative links makes the
            # REFERENCE crawler's done-set hash-seed-nondeterministic: a
            # page holding raws "p5" and "/p5" (equal normalized) keeps an
            # arbitrary one (set semantics), and under a /redirect/<p> base
            # the two join to different urls (SURVEY §4). Deterministic
            # corpora enable at most one of the two features.
            links.append(f"/redirect/p{rng.randrange(1, max(2, n_pages))}")
    if rng.random() < 0.3:
        links.append(rng.choice(links))                # literal duplicate
    if j == 0:
        # robots-disallowed targets, reachable from the root (discovered ->
        # seen, gated -> never done; crawler.py:223-227)
        links += ["/private/x0", "/private/x1"]
        # transport-parity traps, linked from the root:
        # a query-carrying PAGE linked with UNSORTED params (normalization
        # must sort them before the fetch hits the corpus key) and a
        # percent-encoding page linked with a raw space
        links += ["/q0?b=2&a=1", "/a b0"]
    return links


def default_robots(crawl_delay: int | None = None) -> str:
    """Rules in the shape of the reference's robots fixtures
    (tests/test_crawler.py:212-225): Disallow before Allow (urllib's
    robotparser is first-match-wins), a deny-all stanza for another agent,
    optional Crawl-delay."""
    lines = ["User-agent: *", "Disallow: /private", "Allow: /"]
    if crawl_delay is not None:
        lines.append(f"Crawl-delay: {crawl_delay}")
    lines += ["", "User-agent: EvilBot", "Disallow: /"]
    return "\n".join(lines) + "\n"


def generate_corpus(
    out_dir: str,
    n_hosts: int = 4,
    pages_per_host: int = 64,
    links_per_page: int = 8,
    seed: int = 42,
    n_buckets: int = N_BUCKETS_DEFAULT,
    skew_host_frac: float = 0.0,
    robots: dict | None = None,
    crawl_delays: dict | None = None,
    hosts: list | None = None,
    relative_links: bool = True,
    redirect_links: bool = True,
    seed_every: int | None = None,
) -> dict:
    """Write a corpus under ``out_dir/corpus/bucket=<b>/`` + ``seeds.parquet``.

    skew_host_frac > 0 gives host 0 that fraction of ALL pages (bench §5:
    deliberately skewed host to exercise salted fetch repartition).
    robots: host -> rules text override; ``None`` entry -> no robots row
    (404 -> allow-all, crawler.py:186-192). crawl_delays: host -> seconds
    appended as ``Crawl-delay``.

    Returns {"corpus": corpus_dir, "seeds": seeds_path, "n_rows": int}.
    """
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)

    total_pages = n_hosts * pages_per_host
    if skew_host_frac > 0:
        hot = max(pages_per_host, int(total_pages * skew_host_frac))
        rest = max(1, (total_pages - hot) // max(1, n_hosts - 1))
        pages_by_host = [hot] + [rest] * (n_hosts - 1)
    else:
        pages_by_host = [pages_per_host] * n_hosts

    robots = robots or {}
    crawl_delays = crawl_delays or {}

    if hosts is not None:
        n_hosts = len(hosts)
        if len(pages_by_host) != n_hosts:
            pages_by_host = [pages_per_host] * n_hosts

    jobs = []
    for i in range(n_hosts):
        host = hosts[i] if hosts is not None else f"h{i}.example.com"
        if host in robots:
            rules = robots[host]
        else:
            rules = default_robots(crawl_delays.get(host))
        jobs.append(
            (host, i, pages_by_host[i], links_per_page, seed,
             relative_links, redirect_links, seed_every, rules)
        )

    # per-host generation is independent and seeded -> deterministic under
    # parallelism; only parallelize when the corpus is large enough to pay
    if n_hosts * max(pages_by_host) > 20_000 and n_hosts > 1:
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(n_hosts, 8)) as ex:
            results = list(ex.map(_host_rows, jobs))
    else:
        results = [_host_rows(j) for j in jobs]

    buckets = {b: {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
               for b in range(n_buckets)}
    seeds = []
    n_rows = 0
    for host_seeds, rows in results:
        seeds += host_seeds
        for url, ts, html, text, lang in rows:
            b = buckets[host_bucket(url.split("://", 1)[1].split("/", 1)[0],
                                    n_buckets)]
            b["url"].append(url)
            b["warc_ts"].append(ts)
            b["html"].append(html)
            b["text"].append(text)
            b["lang"].append(lang)
            n_rows += 1

    schema = corpus_schema()
    for b, cols in buckets.items():
        d = os.path.join(corpus_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table(cols, schema=schema), os.path.join(d, "part-0.parquet"))

    seeds_path = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(pa.table({"url": seeds, "depth": [0] * len(seeds)}), seeds_path)
    return {"corpus": corpus_dir, "seeds": seeds_path, "n_rows": n_rows}


def _host_rows(job):
    """Generate one host's pages (runs in a worker process for big corpora).

    warc_ts is deterministic per (host index, local row): EPOCH +
    host_idx*10^6 + local_idx seconds — independent of generation order.
    """
    (host, host_idx, n_pages, links_per_page, seed,
     relative_links, redirect_links, seed_every, rules) = job
    langs = ["en"] * 8 + ["de", "fr"]
    rows = []
    local = 0

    def emit(url, html_str, text, lang):
        nonlocal local
        ts = EPOCH + datetime.timedelta(seconds=host_idx * 1_000_000 + local)
        rows.append((url, ts, html_str.encode("utf-8"), text, lang))
        local += 1

    host_seeds = [f"http://{host}/"]
    if seed_every:
        # wide seed list (every Nth page): the production shape of a
        # re-crawl from a known frontier — BFS-from-one-root warmup rounds
        # are inherently serial and don't reflect engine throughput at
        # 1e10-frontier scale
        host_seeds += [
            f"http://{host}{_page_path(j)}"
            for j in range(seed_every, n_pages, seed_every)
        ]

    for j in range(n_pages):
        rng = random.Random((seed, host, j).__repr__())
        links = _links_for_page(rng, j, n_pages, links_per_page, host,
                                relative_links=relative_links,
                                redirect_links=redirect_links)
        html = page_html(links)
        emit(f"http://{host}{_page_path(j)}", html, page_text(html),
             rng.choice(langs))

    # a couple of robots-disallowed pages, linked from the root
    # (reference: disallowed -> skipped, stays in seen, crawler.py:223-227)
    for k in range(2):
        html = page_html([_page_path(k)])
        emit(f"http://{host}/private/x{k}", html, page_text(html), "en")

    # transport-parity pages (linked from the root, see _links_for_page):
    # corpus keys are NORMALIZED urls — sorted query params, percent-encoded
    # path — reachable only if the whole trim/join/normalize/fetch chain
    # agrees with what an HTTP client actually sends
    html = page_html([_page_path(0)])
    emit(f"http://{host}/q0?a=1&b=2", html, page_text(html), "en")
    emit(f"http://{host}/a%20b0", html, page_text(html), "en")

    # non-html mime rows (WrongMIMEType -> done without links)
    for p in ("/doc1.pdf", "/img1.png", "/style.css"):
        emit(f"http://{host}{p}", "", "", "en")

    if rules is not None:
        emit(f"http://{host}/robots.txt", rules, rules, "en")

    return host_seeds, rows
