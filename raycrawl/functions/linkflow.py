"""The trim → join → same-authority-filter composition of the crawl loop.

Replicates the reference's ``Crawler._parse_hrefs``
(/root/reference/simple_crawler/crawler.py:132-143) as a pure function over
(raw, normalized) href pairs. Order of operations is load-bearing and
exactly mirrors the reference:

1. trim     — blank query/fragment on the RAW components (hyperlink.py:60-81);
              note trim always round-trips through urlsplit/urlunsplit, which
              canonicalizes degenerate raw forms like a trailing lone ``?``
2. join     — urljoin of the page's RAW url with the trimmed RAW href
              (hyperlink.py:115-124)
3. filter   — keep links whose normalized authority equals the page's
              normalized authority (hyperlink.py:195-209, crawler.py:140)

Each stage dedups on the normalized form of its output (reference:
HyperlinkSet set semantics); we keep the FIRST raw representative in input
order, which makes the composition fully deterministic (the reference's
set-iteration order is hash-seed dependent; its deterministic artifacts are
the resulting SETS — see SURVEY §4 ordering note).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from raycrawl.functions.canonicalize import (
    authority_of,
    join_url,
    normalise_authority,
    normalise_url_cached,
    trim_url,
)

__all__ = ["parse_page_hrefs"]

_DOT_SEGMENT = re.compile(r"(?:^|/)\.{1,2}(?:/|$)")
# a bare filename segment: no scheme colon, no slash, no query/fragment,
# not a dot segment ("." / ".." excluded by requiring a non-dot char)
_PLAIN_SEGMENT = re.compile(r"^(?!\.{1,2}$)[A-Za-z0-9._~%\-]+$")
# absolute http(s) href with a canonical netloc and NO query/fragment:
# urljoin(base, t) == t (cross-scheme returns the href verbatim; same-
# scheme-with-netloc round-trips through urlparse/urlunparse, which is the
# identity on this shape — the round trip only rewrites degenerate forms
# like a trailing lone "?", excluded here), and group 1 is the normalized
# authority without re-parsing (lowercase, no edge dots, no userinfo).
# Fuzz-proven vs the slow path.
_ABS_HREF = re.compile(
    r"^https?://"
    r"((?![.])[a-z0-9.\-]*[a-z0-9\-](?::[0-9]*)?)"
    r"(?=/|$)[^?#]*(?<!;)$"
)
# urljoin goes through urlparse, which splits ``;params`` off the LAST path
# segment; empty params (a lone trailing ";") are silently dropped on
# re-assembly ("/x;" -> "/x"). Any ";" sitting immediately before "?", "#",
# or end-of-string can hit that edge, so such hrefs take the slow urljoin
# path (conservative superset of the lossy cases: "/x;;" round-trips fine
# but is excluded too).
_SEMI_PARAMS_RISK = re.compile(r";(?=[?#]|$)")

# per-process memo of the pure trim transform (hrefs repeat across pages)
_TRIM_CACHE: dict = {}
_TRIM_CACHE_MAX = 500_000


def _trim_cached(raw: str, tq: bool, tf: bool) -> str:
    key = (raw, tq, tf)
    v = _TRIM_CACHE.get(key)
    if v is None:
        v = trim_url(raw, query=tq, fragment=tf)
        if len(_TRIM_CACHE) >= _TRIM_CACHE_MAX:
            _TRIM_CACHE.clear()
        _TRIM_CACHE[key] = v
    return v


def parse_page_hrefs(
    raw_hrefs,
    base_raw: str,
    trim_query: bool = True,
    trim_fragment: bool = True,
    filter_authority: bool = True,
) -> list:
    """(raw hrefs, page raw url) -> [(candidate_raw, candidate_norm), ...].

    ``candidate_raw`` is the urljoin resolution string — it becomes the
    frontier row's raw url (the reference enqueues the joined Hyperlink whose
    ``_input_url`` is exactly this resolution, crawler.py:159-163), used as
    the base when the candidate's own page is later parsed.

    Hot-path notes: trim results and normalizations are memoized per worker
    (pure functions, repeating inputs), and absolute-path hrefs take the
    RFC-3986 shortcut ``join(base, "/p") == scheme://netloc + "/p"`` —
    identical to urljoin's result, with the candidate authority known to be
    the page's without re-parsing.
    """
    base_parts = urlsplit(base_raw)
    page_authority = normalise_authority(base_parts.netloc)
    origin = (
        f"{base_parts.scheme}://{base_parts.netloc}"
        if base_parts.scheme and base_parts.netloc
        else None
    )
    # plain-segment fast join: urljoin(base, "seg") == origin + base_dir +
    # "seg" when seg is a simple filename and the base path holds no dot
    # segments (urljoin would otherwise collapse them in the merged path)
    seg_prefix = None
    if origin is not None:
        bp = base_parts.path
        if not _DOT_SEGMENT.search(bp):
            base_dir = bp[: bp.rfind("/") + 1] if "/" in bp else "/"
            seg_prefix = origin + base_dir

    # stage 1: trim (always applied — the urlunsplit round-trip is part of
    # the reference semantics even with both flags off)
    trimmed, seen = [], set()
    for raw in raw_hrefs:
        t = _trim_cached(raw, trim_query, trim_fragment)
        key = normalise_url_cached(t)
        if key not in seen:
            seen.add(key)
            trimmed.append(t)

    # stage 2: join against the page's RAW url; stage 3: same-authority
    out, seen = [], set()
    for t in trimmed:
        if (
            origin is not None
            and t.startswith("/")
            and not t.startswith("//")
            and not _DOT_SEGMENT.search(t)  # urljoin resolves "/a/../b"
            and not _SEMI_PARAMS_RISK.search(t)  # urljoin drops lone ";params"
        ):
            j = origin + t
            auth = page_authority
        elif seg_prefix is not None and _PLAIN_SEGMENT.match(t):
            j = seg_prefix + t
            auth = page_authority
        else:
            m = _ABS_HREF.match(t)
            if m:
                # absolute reference: the base never matters, and the
                # canonical netloc IS its normalized authority
                j = t
                auth = m.group(1)
            else:
                j = join_url(base_raw, t)
                auth = authority_of(j)
        key = normalise_url_cached(j)
        if key in seen:
            continue
        seen.add(key)
        # filter_authority=False keeps cross-host candidates (the full web
        # graph, e.g. for link analysis); True is the reference's crawl
        # gate (crawler.py same-authority filter)
        if not filter_authority or auth == page_authority:
            out.append((j, key))
    return out
