"""Extraction + row routing + frontier offer: the post-fetch logic.

Turns fetch results into the round's "tall" event table and pushes
discovered candidate links to their owning FrontierShard actors. html bytes
never leave this stage; the tall table is small (no bodies), so per-round
materialization and driver aggregation stay cheap even at large rounds.

Row routing encodes the reference's error semantics exactly
(/root/reference/simple_crawler/crawler.py:145-180):

* status 2xx/3xx, html mime      -> kind=done + edge rows + candidates
* status 2xx, non-html mime      -> kind=done, NO extraction (WrongMIMEType
                                    -> done-without-links, crawler.py:176-180)
* status 4xx/5xx                 -> kind=error, NOT done (crawler.py:168-174)
* unparsable page (valueless
  ``<a href>``)                  -> kind=error (the reference's behavior is
                                    executor-dependent — swallowed under
                                    threads, fatal under workers=1, SURVEY
                                    §3.1; we route it deterministically)
* robots-blocked (round stage)   -> kind=blocked, NOT fetched, stays seen

Candidates go through trim -> join -> same-authority filter
(functions/linkflow.py) with the page's RAW url as join base, then are
offered to ``shard_of_host(host)`` — the shard buffers them and the driver
commits the round after the barrier (deterministic first-wins dedup).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from raycrawl.functions.canonicalize import normalise_url, url_host
from raycrawl.functions.extract import ExtractError, hrefs_with_norm
from raycrawl.functions.linkflow import parse_page_hrefs
from raycrawl.state.frontier import shard_of_host

__all__ = ["ExtractRouter", "TALL_SCHEMA", "empty_tall", "blocked_rows"]


TALL_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),       # done | error | edge | blocked
        ("url_norm", pa.string()),   # page url (done/error/blocked), null for edge
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("status", pa.int16()),
        ("content_type", pa.string()),
        ("src_url", pa.string()),    # edge rows: the page the href was found on
        ("href_norm", pa.string()),  # edge rows: per-page normalized href (pre-join)
        ("err", pa.string()),
        ("text", pa.string()),       # done rows: golden extracted text (byte-identity)
    ]
)


def empty_tall() -> pa.Table:
    return TALL_SCHEMA.empty_table()


class _TallBuilder:
    def __init__(self):
        self.cols = {name: [] for name in TALL_SCHEMA.names}

    def row(self, **kw):
        for name in TALL_SCHEMA.names:
            self.cols[name].append(kw.get(name))

    def table(self) -> pa.Table:
        return pa.table(self.cols, schema=TALL_SCHEMA)


def blocked_rows(url_norms, hosts, depths) -> pa.Table:
    """Robots-blocked frontier rows -> tall 'blocked' rows (stay seen,
    never done — crawler.py:223-227)."""
    n = len(url_norms)
    cols = {name: [None] * n for name in TALL_SCHEMA.names}
    cols["kind"] = ["blocked"] * n
    cols["url_norm"] = list(url_norms)
    cols["host"] = list(hosts)
    cols["depth"] = list(depths)
    return pa.table(cols, schema=TALL_SCHEMA)


class ExtractRouter:
    """Fetched batch (pa.Table) -> tall table; offers candidates and done
    marks to the FrontierShard actors (ray.get inside = completion barrier:
    when the round's Dataset is consumed, every offer has landed)."""

    def __init__(self, shards, config, max_depth=None):
        self.shards = shards
        self.num_shards = len(shards)
        self.allowed_mimes = tuple(m.lower() for m in config.allowed_mime_types)
        self.trim_query = config.trim_query
        self.trim_fragment = config.trim_fragment
        self.record_redirects = config.record_redirects
        self.max_depth = max_depth

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = _TallBuilder()
        cand_by_shard = {}   # shard -> [(url_raw, url_norm, host, depth)]
        done_by_shard = {}   # shard -> [url_norm]

        for raw, norm, host, depth, status, ctype, loc, html, text in zip(
            batch.column("url_raw").to_pylist(),
            batch.column("url_norm").to_pylist(),
            batch.column("host").to_pylist(),
            batch.column("depth").to_pylist(),
            batch.column("status").to_pylist(),
            batch.column("content_type").to_pylist(),
            batch.column("location").to_pylist(),
            batch.column("html").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            s = str(status)
            if s.startswith("4") or s.startswith("5"):
                # ClientError/ServerError: NOT done (crawler.py:168-174)
                out.row(kind="error", url_norm=norm, host=host, depth=depth,
                        status=status, content_type=ctype,
                        err=f"{status} status")
                continue

            mime_ok = any(m in (ctype or "").lower() for m in self.allowed_mimes)
            is_redirect = self.record_redirects and s.startswith("3")
            if not mime_ok and not is_redirect:
                # WrongMIMEType: done, no extraction (crawler.py:176-180)
                done_by_shard.setdefault(
                    shard_of_host(host, self.num_shards), []
                ).append(norm)
                out.row(kind="done", url_norm=norm, host=host, depth=depth,
                        status=status, content_type=ctype, text=text)
                continue

            if is_redirect:
                # hrefs = {Location header} (crawler.py:124-128)
                pairs = [(loc, normalise_url(loc))] if loc else []
            else:
                try:
                    pairs = hrefs_with_norm(
                        bytes(html).decode("utf-8", errors="replace")
                        if isinstance(html, (bytes, bytearray, memoryview))
                        else (html or "")
                    )
                except ExtractError as exc:
                    out.row(kind="error", url_norm=norm, host=host,
                            depth=depth, status=status, content_type=ctype,
                            err=str(exc))
                    continue

            for _href_raw, href_norm in pairs:
                out.row(kind="edge", src_url=norm, href_norm=href_norm,
                        host=host, depth=depth)

            cand_depth = (depth or 0) + 1
            if self.max_depth is None or cand_depth <= self.max_depth:
                for cand_raw, cand_norm in parse_page_hrefs(
                    [r for r, _ in pairs], raw,
                    trim_query=self.trim_query,
                    trim_fragment=self.trim_fragment,
                ):
                    chost = url_host(cand_raw)
                    cand_by_shard.setdefault(
                        shard_of_host(chost, self.num_shards), []
                    ).append((cand_raw, cand_norm, chost, cand_depth))

            done_by_shard.setdefault(
                shard_of_host(host, self.num_shards), []
            ).append(norm)
            out.row(kind="done", url_norm=norm, host=host, depth=depth,
                    status=status, content_type=ctype, text=text)

        futs = [
            self.shards[i].offer_buffer.remote(rows)
            for i, rows in cand_by_shard.items()
        ]
        futs += [
            self.shards[i].mark_done.remote(urls)
            for i, urls in done_by_shard.items()
        ]
        if futs:
            ray.get(futs)
        return out.table()
