"""HTML anchor-href extraction — semantics-compatible with the reference.

Replicates /root/reference/simple_crawler/parser.py:11-56 behavior
(verified against tests/test_parser.py:12-158 and empirically pinned edge
cases, SURVEY §2.2 M4):

* only ``<a>`` start tags are inspected; only their ``href`` attributes kept
* HTMLParser with default ``convert_charrefs=True`` → entities unescaped
  (``&amp;`` -> ``&``) before we see attribute values
* uppercase tags are lowercased by HTMLParser; comments and script bodies
  contribute nothing; duplicate ``href`` attributes on one tag BOTH count
* a valueless ``<a href>`` attribute yields ``value=None`` — the reference
  raises TypeError from make_hyperlink (hyperlink.py:137-138) and the page
  becomes an error; we surface it as ``ExtractError`` so the batch stage can
  route the page to the error side-output deterministically
* per-page de-duplication is on the NORMALIZED url (reference: HyperlinkSet
  of Hyperlink, hash = normalized string) keeping the FIRST raw form in
  document order — document order is what a Python set's insert-wins gives

The golden per-page ``text`` invariant (BASELINE.json input_hint): the
sorted, newline-joined normalized hrefs of the page must be byte-identical
to the reference parser+normalizer output.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from raycrawl.functions.canonicalize import normalise_url_cached

__all__ = [
    "ExtractError",
    "hrefs_with_norm",
    "hrefs_from_html",
    "page_text",
    "extract_edges_rows",
]


class ExtractError(ValueError):
    """A page whose markup the reference would crash on (valueless href)."""


# --- fast path: strictly well-formed pages -------------------------------
# Applies only when the page provably contains nothing HTMLParser treats
# specially: no comments/PI/doctype ("<!", "<?"), no script/style bodies,
# and every <a ...> tag is a run of double-quoted, entity-free attributes.
# Anything else falls back to the HTMLParser (byte-identical semantics);
# the fuzz suite proves fast == parser on the pages the gate accepts.
_PAGE_GATE = re.compile(
    # comments/PI/doctype/script/style; a "<" inside a tag body (malformed
    # tags can swallow a following <a> in HTMLParser); unbalanced quote
    # shapes are rejected tag-by-tag by _STRICT_TAG below
    r"<!|<\?|<script|<style|<[^>]*<",
    re.I,
)
_A_TAG = re.compile(r"<a(?=[\s/>])([^<>]*)>", re.I)
_STRICT_TAG = re.compile(r'^(?:\s+[a-zA-Z-]+\s*=\s*"[^"<>&]*")*\s*/?$')
_ATTR = re.compile(r'([a-zA-Z-]+)\s*=\s*"([^"<>&]*)"')


def _fast_hrefs(html: str):
    """Raw hrefs in document order, or None if the page needs the parser."""
    if _PAGE_GATE.search(html):
        return None
    out = []
    for m in _A_TAG.finditer(html):
        body = m.group(1)
        if not _STRICT_TAG.match(body):
            return None
        for name, val in _ATTR.findall(body):
            if name.lower() == "href":
                out.append(val)
    return out


class _AnchorHrefs(HTMLParser):
    """Collect raw href values of <a> tags, in document order."""

    def __init__(self):
        super().__init__()
        self.hrefs: list = []

    def handle_starttag(self, tag, attrs):
        if tag != "a":
            return
        for name, value in attrs:
            if name == "href":
                if value is None:
                    raise ExtractError("valueless href attribute")
                self.hrefs.append(value)

    def error(self, message):  # pragma: no cover — parity stub
        pass


def hrefs_with_norm(html: str) -> list:
    """Per-page (raw, normalized) href pairs, deduped on normalized form.

    Keeps the FIRST-seen raw string for each distinct normalized URL, in
    document order. Raises ExtractError on valueless ``href`` (the
    page-level error row path).
    """
    raws = _fast_hrefs(html)
    if raws is None:
        p = _AnchorHrefs()
        p.feed(html)
        raws = p.hrefs
    seen = set()
    out = []
    for raw in raws:
        key = normalise_url_cached(raw)
        if key not in seen:
            seen.add(key)
            out.append((raw, key))
    return out


def hrefs_from_html(html: str) -> list:
    """Raw hrefs of a page, deduped on normalized form, document order."""
    return [raw for raw, _ in hrefs_with_norm(html)]


def page_text(html: str) -> str:
    """Golden extraction for one page: sorted, newline-joined normalized hrefs.

    This is the byte-identical-per-url invariant surface (BASELINE.json):
    compare byte-for-byte with the corpus ``text`` column.
    """
    return "\n".join(sorted(norm for _, norm in hrefs_with_norm(html)))


def extract_edges_rows(src_urls, htmls):
    """Batch explode: (src_url, html bytes/str) pairs -> flat edge columns.

    Returns (src_out, href_raw, href_norm, err_src, err_msg) python lists —
    the map_batches wrapper turns them into Arrow columns. One output row per
    deduped href; pages that fail to parse/decode produce an error row
    instead (deterministic routing of the reference's executor-dependent
    exception behavior, SURVEY §3.1 step 4).
    """
    src_out, href_raw, href_norm = [], [], []
    err_src, err_msg = [], []
    for src, html in zip(src_urls, htmls):
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = bytes(html).decode("utf-8", errors="replace")
        try:
            pairs = hrefs_with_norm(html)
        except ExtractError as exc:
            err_src.append(src)
            err_msg.append(str(exc))
            continue
        for raw, norm in pairs:
            src_out.append(src)
            href_raw.append(raw)
            href_norm.append(norm)
    return src_out, href_raw, href_norm, err_src, err_msg
