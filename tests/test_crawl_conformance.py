"""End-to-end conformance: our Ray pipeline vs the REFERENCE crawler.

The same synthetic corpus is (a) served over localhost HTTP to the actual
reference ``simple_crawler.Crawler`` and (b) fed as Parquet to our Ray Data
pipeline. Golden artifacts compared (BASELINE.md): done-set equality,
seen-set equality, per-URL BFS depth (workers=1), byte-identical per-page
extraction.
"""

import pytest

from raycrawl.config import CrawlConfig
from raycrawl.pipelines.crawl import crawl
from raycrawl.sources.synth import generate_corpus

from tests.ref_harness import (
    CorpusServer,
    load_corpus_dict,
    reference_bfs_depths,
    run_reference_crawler,
)

pytest.importorskip("simple_crawler")
pytest.importorskip("flask")

PORT = 9973
HOST = f"127.0.0.1:{PORT}"


# Deterministic corpus/config flavors (redirect pages + relative links
# together make the REFERENCE's done-set hash-seed-nondeterministic — see
# sources/synth.py _links_for_page): redirects-without-relatives and
# relatives-without-redirects jointly cover both link feature sets e2e;
# the extra flavors run the reference with check_head=True (HEAD-before-GET
# over real HTTP) and with trim flags off (query/fragment urls fetched).
@pytest.fixture(
    scope="module",
    params=[
        (dict(relative_links=False, redirect_links=True), {}),
        (dict(relative_links=True, redirect_links=False), {}),
        (dict(relative_links=False, redirect_links=True),
         dict(check_head=True)),
        (dict(relative_links=False, redirect_links=False),
         dict(trim_query=False, trim_fragment=False)),
    ],
    ids=["redirects", "relatives", "check-head", "with-query"],
)
def corpus(tmp_path_factory, request):
    corpus_kw, config_kw = request.param
    out = tmp_path_factory.mktemp("conformance")
    info = generate_corpus(
        str(out), hosts=[HOST], pages_per_host=14, links_per_page=6, seed=11,
        **corpus_kw,
    )
    info["dict"] = load_corpus_dict(info["corpus"])
    info["seed_url"] = f"http://{HOST}/"
    info["config_kw"] = config_kw
    return info


@pytest.fixture(scope="module")
def ours(ray_session, corpus):
    return crawl(
        corpus["corpus"],
        [corpus["seed_url"]],
        CrawlConfig(num_shards=2, fetch_concurrency=2, user_agent="RayCrawl",
                    **corpus["config_kw"]),
        n_buckets=8,
    )


@pytest.fixture(scope="module")
def theirs(corpus):
    with CorpusServer(corpus["dict"], port=PORT):
        return run_reference_crawler(
            corpus["seed_url"], user_agent="RayCrawl", **corpus["config_kw"]
        )


def test_done_set_matches_reference(ours, theirs):
    assert ours.done_urls() == theirs["done"]
    assert ours.done_urls() == theirs["result"]


def test_seen_set_matches_reference(ours, theirs):
    assert ours.seen_urls() == theirs["seen"]


def test_bfs_depths_match_oracle(ours, corpus):
    kw = corpus["config_kw"]
    oracle = reference_bfs_depths(
        corpus["dict"], corpus["seed_url"],
        trim_query=kw.get("trim_query", True),
        trim_fragment=kw.get("trim_fragment", True),
    )
    ours_depths = ours.depths()
    golden = {u: d for u, d in oracle["depths"].items() if u in oracle["done"]}
    assert ours_depths == golden
    # the oracle replay itself agrees with our sets (independent derivation)
    assert oracle["done"] == ours.done_urls()
    assert oracle["seen"] == ours.seen_urls()


def test_extraction_byte_identical(ours, corpus):
    """Every done html page's text must equal the reference extraction,
    byte for byte (BASELINE.json per-row invariant)."""
    from simple_crawler.parser import get_hrefs_from_html

    done = ours.done_table()
    checked = 0
    for url, ct, text in zip(
        done["url_norm"].to_pylist(),
        done["content_type"].to_pylist(),
        done["text"].to_pylist(),
    ):
        if "text/html" not in (ct or ""):
            continue
        # follow the redirect chain like requests does for the reference
        from urllib.parse import urljoin, urlsplit

        target = url.split("#", 1)[0]  # transport strips fragments
        for _ in range(8):
            p = urlsplit(target).path
            if p.startswith("/redirect/"):
                target = urljoin(target, "/" + p[len("/redirect/"):])
            else:
                break
        html, _ = corpus["dict"][target]
        ref_text = "\n".join(
            sorted(str(l) for l in get_hrefs_from_html(bytes(html).decode()))
        )
        assert text.encode() == ref_text.encode(), url
        checked += 1
    assert checked > 5


def test_robots_blocked_stay_seen_not_done(ours):
    """/private pages: discovered (seen) but robots-gated (never done)."""
    blocked_urls = [u for u in ours.seen_urls() if "/private/" in u]
    assert blocked_urls, "corpus should link to /private pages"
    assert not [u for u in ours.done_urls() if "/private/" in u]


def test_errors_not_done(ours):
    errs = ours.errors()
    assert errs.num_rows > 0
    err_urls = set(errs["url_norm"].to_pylist())
    assert err_urls.isdisjoint(ours.done_urls())
    assert all(400 <= s < 600 for s in errs["status"].to_pylist())
    # /error/ pages always present; query-trimmed or query-carrying urls
    # absent from the corpus additionally 404 — also errors
    assert any("/error/" in u for u in err_urls)
    assert all(
        "/error/" in u or "?" in u or u.endswith("/q0") for u in err_urls
    )


def test_non_html_done_without_links(ours):
    done = ours.done_table()
    pdfs = done.to_pylist()
    pdf_rows = [r for r in pdfs if r["url_norm"].endswith(".pdf")]
    assert pdf_rows and all(r["content_type"] == "text/pdf" for r in pdf_rows)
    edge_srcs = set(ours.edges()["src_url"].to_pylist())
    assert all(r["url_norm"] not in edge_srcs for r in pdf_rows)
