"""Harness for running the REFERENCE crawler against a synth corpus.

Serves the corpus over a real localhost HTTP server (the reference uses
``requests``) with the same status/mime/redirect rules as our
FetchSimulator (FIXTURES.md), and provides a depth oracle: a BFS replay
built ON TOP OF the reference's own parser/linkflow components (imported
from /root/reference — run, never copied).
"""

from __future__ import annotations

import threading
from urllib.parse import urljoin

import pyarrow.dataset as pads
from werkzeug.serving import make_server

from flask import Flask, Response, redirect, request

from raycrawl.stages.fetchsim import content_type_for_path


def load_corpus_dict(corpus_path: str) -> dict:
    """url -> (html bytes, text str) for every corpus row."""
    tbl = pads.dataset(corpus_path, partitioning="hive").to_table(
        columns=["url", "html", "text"]
    )
    return dict(
        zip(
            tbl["url"].to_pylist(),
            zip(tbl["html"].to_pylist(), tbl["text"].to_pylist()),
        )
    )


class CorpusServer:
    """Threaded HTTP server with the FetchSimulator's routing rules."""

    def __init__(self, corpus: dict, host="127.0.0.1", port=9973):
        self.corpus = corpus
        self.host, self.port = host, port
        app = Flask("corpus")

        @app.route("/", defaults={"path": ""})
        @app.route("/<path:path>")
        def serve(path):
            from urllib.parse import quote

            # werkzeug decodes percent-escapes; corpus keys are NORMALIZED
            # urls, so re-encode the path the way the normalizer does
            p = quote(request.path, safe="/")
            if p.startswith("/error/"):
                try:
                    code = int(p.split("/")[2])
                except (IndexError, ValueError):
                    code = 404
                return Response("err", status=code, mimetype="text/html")
            if p.startswith("/redirect/"):
                return redirect("/" + p[len("/redirect/"):], code=302)
            url = f"http://{host}:{port}{p}"
            if request.query_string:
                url += "?" + request.query_string.decode()
            row = self.corpus.get(url)
            ct = content_type_for_path(p)
            if row is None:
                return Response("missing", status=404, mimetype=ct)
            html, _text = row
            return Response(bytes(html or b""), status=200, mimetype=ct)

        self._srv = make_server(host, port, app, threaded=True)
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._srv.shutdown()
        self._thread.join(timeout=5)

    @property
    def base(self) -> str:
        return f"http://{self.host}:{self.port}/"


def run_reference_crawler(seed_url: str, **crawler_kwargs) -> dict:
    """Run the reference Crawler, capturing seen/done before its reset."""
    from simple_crawler.crawler import Crawler

    crawler = Crawler(max_workers=1, timeout=1, **crawler_kwargs)
    captured = {}
    orig = crawler._render_results

    def wrapped():
        captured["seen"] = {str(u) for u in crawler._seen_urls}
        captured["done"] = {str(u) for u in crawler._done_urls}
        return orig()

    crawler._render_results = wrapped
    captured["result"] = crawler.crawl(seed_url)
    return captured


def reference_bfs_depths(corpus: dict, seed_url: str, user_agent="RayCrawl",
                         obey_robots=True, trim_query=True,
                         trim_fragment=True) -> dict:
    """Depth oracle: BFS replay using the REFERENCE's parser + linkflow.

    Depth is order-independent (first discovery is always at the minimal
    BFS level), which makes this the reference's deterministic depth
    artifact under workers=1 (SURVEY §4).
    Returns {"depths": {url: level}, "seen": set, "done": set}.
    """
    import urllib.robotparser

    from simple_crawler.crawler import Crawler
    from simple_crawler.hyperlink import make_hyperlink
    from simple_crawler.parser import get_hrefs_from_html

    crawler = Crawler(user_agent=user_agent, trim_query=trim_query,
                      trim_fragment=trim_fragment)
    seed = make_hyperlink(seed_url)

    robots = urllib.robotparser.RobotFileParser()
    robots_row = corpus.get(str(seed.domain.with_path("robots.txt")))
    robots.parse(
        bytes(robots_row[0]).decode().splitlines() if robots_row else ""
    )

    from urllib.parse import urlsplit

    def fetch(url_str):
        """(status, content_type, html_str) with redirect following.
        Fragment stripped like real HTTP clients do."""
        url = url_str.split("#", 1)[0]
        for _ in range(8):
            path = urlsplit(url).path or "/"
            if path.startswith("/error/"):
                return int(path.split("/")[2]), "text/html", ""
            if path.startswith("/redirect/"):
                url = urljoin(url, "/" + path[len("/redirect/"):])
                continue
            row = corpus.get(url)
            ct = content_type_for_path(path)
            if row is None:
                return 404, ct, ""
            return 200, ct, bytes(row[0] or b"").decode("utf-8")
        return 508, "text/html", ""

    depths = {str(seed): 0}
    seen, done = set(), set()
    level = [seed]
    d = 0
    while level:
        nxt = []
        for url in level:
            u = str(url)
            if u in done:
                continue
            if obey_robots and not robots.can_fetch(user_agent, u):
                continue
            status, ct, html = fetch(u)
            s = str(status)
            if s.startswith("4") or s.startswith("5"):
                continue  # not done (crawler.py:168-174)
            if "text/html" not in ct.lower():
                done.add(u)  # WrongMIMEType -> done, no links
                continue
            hrefs = get_hrefs_from_html(html)
            parsed = crawler._parse_hrefs(hrefs, url)
            done.add(u)
            for href in parsed:
                hs = str(href)
                if hs not in seen:
                    seen.add(hs)
                    if hs not in depths:
                        depths[hs] = d + 1
                    nxt.append(href)
        level = nxt
        d += 1
    return {"depths": depths, "seen": seen, "done": done}
