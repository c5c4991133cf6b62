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

from raycrawl.functions.canonicalize import (
    authority_of,
    join_url,
    normalise_url,
    trim_url,
)

__all__ = ["parse_page_hrefs"]


def parse_page_hrefs(
    raw_hrefs,
    base_raw: str,
    trim_query: bool = True,
    trim_fragment: bool = True,
) -> list:
    """(raw hrefs, page raw url) -> [(candidate_raw, candidate_norm), ...].

    ``candidate_raw`` is the urljoin resolution string — it becomes the
    frontier row's raw url (the reference enqueues the joined Hyperlink whose
    ``_input_url`` is exactly this resolution, crawler.py:159-163), used as
    the base when the candidate's own page is later parsed.
    """
    page_authority = authority_of(base_raw)

    # stage 1: trim (always applied — the urlunsplit round-trip is part of
    # the reference semantics even with both flags off)
    trimmed, seen = [], set()
    for raw in raw_hrefs:
        t = trim_url(raw, query=trim_query, fragment=trim_fragment)
        key = normalise_url(t)
        if key not in seen:
            seen.add(key)
            trimmed.append(t)

    # stage 2: join against the page's RAW url
    joined, seen = [], set()
    for t in trimmed:
        j = join_url(base_raw, t)
        key = normalise_url(j)
        if key not in seen:
            seen.add(key)
            joined.append((j, key))

    # stage 3: same-authority filter
    return [(j, k) for j, k in joined if authority_of(j) == page_authority]
