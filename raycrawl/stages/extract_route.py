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
(functions/linkflow.py) with the page's RAW url as join base and come out
as ``kind='cand'`` rows; after the round barrier the DRIVER routes them to
``shard_of_host(host)`` (vectorized host->shard mapping, one actor call per
shard per round) and commits (deterministic first-wins dedup).
"""

from __future__ import annotations

import pyarrow as pa

from raycrawl.functions.canonicalize import normalise_url, url_host
from raycrawl.functions.extract import ExtractError, hrefs_with_norm
from raycrawl.functions.linkflow import parse_page_hrefs
from raycrawl.state.cuckoo import url_hash64

__all__ = ["ExtractRouter", "TALL_SCHEMA", "empty_tall", "blocked_rows"]


TALL_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),       # done | error | edge | blocked | cand
        ("url_norm", pa.string()),   # page/candidate url, null for edge
        ("url_raw", pa.string()),    # cand rows: the raw join resolution
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("status", pa.int16()),
        ("content_type", pa.string()),
        ("src_url", pa.string()),    # edge rows: the page the href was found on
        ("href_norm", pa.string()),  # edge rows: per-page normalized href (pre-join)
        ("err", pa.string()),
        ("text", pa.string()),       # done rows: golden extracted text (byte-identity)
        ("gshard", pa.int32()),      # cand/done rows: hash(url_norm) % num_shards
    ]                                # — the BALANCED seen-gate partition key
)


def empty_tall() -> pa.Table:
    return TALL_SCHEMA.empty_table()


def _kind_table(kind: str, n: int, **cols) -> pa.Table:
    """Build a tall-schema table for one row kind, null-filling the unused
    columns (columnar construction — no per-row dict churn in the hot path)."""
    arrays = []
    for field in TALL_SCHEMA:
        if field.name == "kind":
            arrays.append(pa.array([kind] * n, pa.string()))
        elif field.name in cols:
            arrays.append(pa.array(cols[field.name], field.type))
        else:
            arrays.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(arrays, schema=TALL_SCHEMA)


def blocked_rows(url_norms, hosts, depths) -> pa.Table:
    """Robots-blocked frontier rows -> tall 'blocked' rows (stay seen,
    never done — crawler.py:223-227)."""
    return _kind_table("blocked", len(url_norms), url_norm=list(url_norms),
                       host=list(hosts), depth=list(depths))


class ExtractRouter:
    """Fetched batch (pa.Table) -> tall table.

    PURE function of its input — candidates and done pages come out as
    tall rows (kind='cand'/'done'); the DRIVER routes them to the
    FrontierShard actors after the round barrier. No actor calls in the
    stage: an in-stage ray.get on a shared actor convoys every worker
    behind the hottest shard and collapses parallelism (measured: 32-CPU
    runs slower than 8-CPU before this restructure)."""

    def __init__(self, config, max_depth=None):
        self.allowed_mimes = tuple(m.lower() for m in config.allowed_mime_types)
        self.trim_query = config.trim_query
        self.trim_fragment = config.trim_fragment
        self.record_redirects = config.record_redirects
        self.max_depth = max_depth
        self.num_shards = config.num_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        # columnar accumulators per row kind (hot path: no per-row dicts)
        dn = {k: [] for k in ("url_norm", "host", "depth", "status",
                              "content_type", "text", "gshard")}
        er = {k: [] for k in ("url_norm", "host", "depth", "status",
                              "content_type", "err")}
        ed = {k: [] for k in ("src_url", "href_norm", "host", "depth")}
        # batch-local candidate dedup, min (depth, url_raw) per url_norm —
        # popular links ("/", nav links) repeat on most pages, so this
        # shrinks the routed candidate volume ~10x before it leaves the task
        cand_best: dict = {}

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
            if 400 <= status < 600:
                # ClientError/ServerError: NOT done (crawler.py:168-174)
                er["url_norm"].append(norm)
                er["host"].append(host)
                er["depth"].append(depth)
                er["status"].append(status)
                er["content_type"].append(ctype)
                er["err"].append(f"{status} status")
                continue

            mime_ok = any(m in (ctype or "").lower() for m in self.allowed_mimes)
            is_redirect = self.record_redirects and 300 <= status < 400

            pairs = ()
            if is_redirect:
                # hrefs = {Location header} (crawler.py:124-128)
                pairs = [(loc, normalise_url(loc))] if loc else []
            elif mime_ok:
                try:
                    pairs = hrefs_with_norm(
                        bytes(html).decode("utf-8", errors="replace")
                        if isinstance(html, (bytes, bytearray, memoryview))
                        else (html or "")
                    )
                except ExtractError as exc:
                    er["url_norm"].append(norm)
                    er["host"].append(host)
                    er["depth"].append(depth)
                    er["status"].append(status)
                    er["content_type"].append(ctype)
                    er["err"].append(str(exc))
                    continue
            # else: WrongMIMEType — done with no extraction (crawler.py:176-180)

            if pairs:
                for _href_raw, href_norm in pairs:
                    ed["src_url"].append(norm)
                    ed["href_norm"].append(href_norm)
                    ed["host"].append(host)
                    ed["depth"].append(depth)

                cand_depth = (depth or 0) + 1
                if self.max_depth is None or cand_depth <= self.max_depth:
                    for cand_raw, cand_norm in parse_page_hrefs(
                        [r for r, _ in pairs], raw,
                        trim_query=self.trim_query,
                        trim_fragment=self.trim_fragment,
                    ):
                        cur = cand_best.get(cand_norm)
                        if cur is None or (cand_depth, cand_raw) < cur:
                            cand_best[cand_norm] = (cand_depth, cand_raw)

            dn["url_norm"].append(norm)
            dn["host"].append(host)
            dn["depth"].append(depth)
            dn["status"].append(status)
            dn["content_type"].append(ctype)
            dn["text"].append(text)
            dn["gshard"].append(url_hash64(norm) % self.num_shards)

        parts = []
        if dn["url_norm"]:
            parts.append(_kind_table("done", len(dn["url_norm"]), **dn))
        if er["url_norm"]:
            parts.append(_kind_table("error", len(er["url_norm"]), **er))
        if ed["src_url"]:
            parts.append(_kind_table("edge", len(ed["src_url"]), **ed))
        if cand_best:
            ca = {
                "url_norm": list(cand_best),
                "depth": [d for d, _ in cand_best.values()],
                "url_raw": [r for _, r in cand_best.values()],
            }
            ca["host"] = [url_host(r) for r in ca["url_raw"]]
            ca["gshard"] = [
                url_hash64(u) % self.num_shards for u in ca["url_norm"]
            ]
            parts.append(_kind_table("cand", len(ca["url_norm"]), **ca))
        if not parts:
            return empty_tall()
        return pa.concat_tables(parts)
