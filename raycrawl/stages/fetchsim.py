"""FetchSimulator — the corpus-lookup replacement for live HTTP.

Actor-pool ``map_batches`` stage (callable class: corpus partition index
loads once per actor in ``__init__``/lazily per bucket, lookups per batch —
the idiomatic Ray Data home for per-worker state). Replaces the reference's
``Requester`` (/root/reference/simple_crawler/requester.py:45-105): status
codes, Content-Type and redirect behavior are derived from the corpus and
the FIXTURES.md rules, mirroring the reference's own test HTTP routes:

* URL absent from corpus              -> 404        (ClientError path)
* path ``/error/<code>``              -> that code  (4xx/5xx paths)
* path ``/redirect/<p>``              -> 302, Location ``/<p>``
* suffix mime map: ``.pdf -> text/pdf``, ``.png -> image/png``,
  ``.css -> text/css``, ``/robots.txt -> text/plain``, else ``text/html``
* ``follow_redirects=True`` (reference default) chases the Location chain
  inside the corpus (bounded hops) and reports the FINAL status/body under
  the ORIGINAL url — exactly what requests does for the reference
* ``check_head`` parity: the mime type is knowable before the body read
  (HEAD-before-GET, requester.py:81-105) so wrong-mime rows skip the body
  lookup entirely — the projection-pushdown analogue

Scale note: the corpus is laid out ``bucket=<b>/`` by host-hash
(sources/synth.py). Each actor lazily loads only the buckets its batches
touch (frontier blocks are per-shard, so actors see few buckets), reading
only ``url, html, text`` columns. At 100 TB the per-bucket dict becomes a
per-bucket lazy row-group index over Parquet metadata; the actor boundary
and batch flow stay identical.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

import pyarrow as pa
import pyarrow.dataset as pads

from raycrawl.functions.canonicalize import normalise_url
from raycrawl.sources.synth import host_bucket

__all__ = ["FetchSimulator", "content_type_for_path"]

_MAX_HOPS = 8


def content_type_for_path(path: str) -> str:
    if path.endswith("/robots.txt"):
        return "text/plain"
    if path.endswith(".pdf"):
        return "text/pdf"
    if path.endswith(".png"):
        return "image/png"
    if path.endswith(".css"):
        return "text/css"
    return "text/html"


class FetchSimulator:
    """map_batches callable: frontier rows -> fetch results.

    In:  url_raw, url_norm, host, depth  (pyarrow batch)
    Out: + status:int16, content_type:string, location:string,
           html:binary, text:string
    """

    def __init__(
        self,
        corpus_path: str,
        n_buckets: int,
        follow_redirects: bool = True,
        load_body_mimes: tuple | None = ("text/html",),
        check_head: bool = False,
        max_cached_buckets: int = 64,
    ):
        self.corpus_path = corpus_path
        self.n_buckets = n_buckets
        self.follow_redirects = follow_redirects
        self.check_head = check_head
        self.load_body_mimes = tuple(m.lower() for m in (load_body_mimes or ()))
        self.max_cached_buckets = max_cached_buckets
        self._buckets: dict = {}  # bucket -> {url: (html, text)}
        self._ds = pads.dataset(corpus_path, partitioning="hive")

    # -- corpus access ------------------------------------------------------
    def _bucket_index(self, b: int) -> dict:
        idx = self._buckets.get(b)
        if idx is None:
            import pyarrow.compute as pc

            tbl = self._ds.to_table(
                columns=["url", "html", "text"],
                filter=pc.field("bucket") == b,
            )
            idx = dict(
                zip(
                    tbl["url"].to_pylist(),
                    zip(tbl["html"].to_pylist(), tbl["text"].to_pylist()),
                )
            )
            if len(self._buckets) >= self.max_cached_buckets:
                self._buckets.pop(next(iter(self._buckets)))
            self._buckets[b] = idx
        return idx

    def _lookup(self, url_norm: str, host: str):
        return self._bucket_index(host_bucket(host, self.n_buckets)).get(url_norm)

    # -- one simulated request ---------------------------------------------
    def _fetch_one(self, url_norm: str, host: str):
        """Returns (status, content_type, location, html, text)."""
        url = url_norm
        for _hop in range(_MAX_HOPS):
            parts = urlsplit(url)
            path = parts.path
            if path.startswith("/error/"):
                try:
                    code = int(path.split("/")[2])
                except (IndexError, ValueError):
                    code = 404
                return code, "text/html", None, None, None
            if path.startswith("/redirect/"):
                location = "/" + path[len("/redirect/"):]
                if not self.follow_redirects:
                    return 302, "text/html", location, None, None
                url = normalise_url(urljoin(url, location))
                continue
            ct = content_type_for_path(path)
            row = self._lookup(url, parts.hostname or host)
            if row is None:
                return 404, ct, None, None, None
            html, text = row
            # HEAD-before-GET: wrong mime means the body is never fetched
            if self.check_head and self.load_body_mimes and not any(
                m in ct.lower() for m in self.load_body_mimes
            ):
                return 200, ct, None, None, text
            return 200, ct, None, html, text
        return 508, "text/html", None, None, None  # redirect loop exhausted

    # -- batch entry --------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        norms = batch.column("url_norm").to_pylist()
        hosts = batch.column("host").to_pylist()
        status, ctype, loc, html, text = [], [], [], [], []
        for u, h in zip(norms, hosts):
            s, c, l, b, t = self._fetch_one(u, h)
            status.append(s)
            ctype.append(c)
            loc.append(l)
            html.append(b)
            text.append(t)
        return (
            batch.append_column("status", pa.array(status, pa.int16()))
            .append_column("content_type", pa.array(ctype, pa.string()))
            .append_column("location", pa.array(loc, pa.string()))
            .append_column("html", pa.array(html, pa.binary()))
            .append_column("text", pa.array(text, pa.string()))
        )
