"""URL canonicalization — byte-compatible with the reference normalizer.

Semantics replicated from /root/reference/simple_crawler/url_normalisation.py
(scalar contract, verified against its doctests and
tests/test_hyperlink.py:7-137):

* scheme    -> lowercase                           (url_normalisation.py:20-35)
* host      -> lowercase + strip leading/trailing "." (url_normalisation.py:38-58)
* userinfo  -> strip ":" ends, case preserved      (url_normalisation.py:61-79)
* authority -> split at "@", normalize both parts, drop empty userinfo;
               NO default-port stripping            (url_normalisation.py:82-122)
* path      -> percent-quote with safe "/%", force leading "/";
               NO dot-segment collapsing            (url_normalisation.py:125-144)
* query     -> quote_plus with safe ":&=", then sort params alphabetically
               by the full "k=v" string             (url_normalisation.py:147-182)
* fragment  -> quote_plus with safe ":~"            (url_normalisation.py:185-207)
* full url  -> urljoin("/", url) FIRST (scheme-less strings become paths),
               then urlsplit -> normalize components -> urlunsplit
                                                    (url_normalisation.py:210-242)

The normalized URL string is the dedup identity of the whole engine
(reference: Hyperlink.__eq__/__hash__, hyperlink.py:90-97).

Optional ``strip_default_ports`` extends the reference (north_star asks for
default-port stripping; the reference explicitly does not do it —
url_normalisation.py:105 todo). It is OFF by default = conformance mode.

Batch entry points (``normalise_url_many``) are what the Ray Data
``map_batches`` stages call: a compiled fast-path regex skips the full
component round-trip for already-canonical URLs (the overwhelmingly common
case in a re-crawl), falling back to the exact scalar pipeline otherwise.
The fast path is property-tested to agree with the scalar pipeline.
"""

from __future__ import annotations

import re
from urllib.parse import quote, quote_plus, urljoin, urlsplit, urlunsplit

__all__ = [
    "normalise_scheme",
    "normalise_host",
    "normalise_userinfo",
    "normalise_authority",
    "normalise_path",
    "normalise_query",
    "normalise_fragment",
    "normalise_url",
    "normalise_url_cached",
    "normalise_url_many",
    "normalise_component_kwargs",
    "split_components",
    "authority_of",
    "trim_url",
    "join_url",
    "url_host",
    "DEFAULT_PORTS",
]


def normalise_scheme(scheme: str) -> str:
    """Lowercase the scheme. ``'HTTPS' -> 'https'``."""
    return scheme.lower()


def normalise_host(host: str) -> str:
    """Lowercase + strip leading/trailing dots.

    ``'www.EXAMPLE.com.' -> 'www.example.com'``. A dot before an explicit
    port survives (``'Example.COM.:80' -> 'example.com.:80'``) because the
    strip only sees string ends — matching the reference exactly.
    """
    return host.lower().strip(".")


def normalise_userinfo(userinfo: str) -> str:
    """Strip ``:`` off both ends; case is preserved. ``'hello:' -> 'hello'``."""
    return userinfo.strip(":")


def normalise_authority(authority: str) -> str:
    """Normalize ``userinfo@host``; empty userinfo is dropped.

    No default-port stripping (conformance with the reference). A netloc
    with more than one ``@`` raises ValueError exactly like the reference's
    two-target unpack (url_normalisation.py:101).
    """
    if authority == "":
        return authority
    if "@" in authority:
        userinfo, host = authority.split("@")
        userinfo = normalise_userinfo(userinfo)
    else:
        userinfo, host = "", authority
    host = normalise_host(host)
    return f"{userinfo}@{host}" if userinfo else host


def normalise_path(path: str) -> str:
    """Percent-quote (keeping ``/`` and ``%``) and force a leading slash.

    ``'hello world' -> '/hello%20world'``; dot segments are NOT collapsed.
    """
    path = quote(path, safe="/%")
    return path if path.startswith("/") else "/" + path


def normalise_query(query: str, sort_params: bool = True) -> str:
    """quote_plus (keeping ``:&=``), then sort ``k=v`` params as strings.

    ``'z=y&a=b' -> 'a=b&z=y'``; ``'greeting=hi there' -> 'greeting=hi+there'``.
    """
    query = quote_plus(query, safe=":&=")
    if sort_params is False:
        return query
    if sort_params is True:
        return "&".join(sorted(query.split("&")))
    raise TypeError("sort_params must be True or False")


def normalise_fragment(fragment: str) -> str:
    """quote_plus keeping ``:~``. ``'hello world' -> 'hello+world'``."""
    return quote_plus(fragment, safe=":~")


#: scheme -> default port, used only when strip_default_ports=True (extension;
#: the reference never strips ports — url_normalisation.py:105 todo).
DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def _strip_default_port(authority: str, scheme: str) -> str:
    port = DEFAULT_PORTS.get(scheme)
    if port and authority.endswith(":" + port):
        return authority[: -(len(port) + 1)]
    return authority


# Fast path: an absolute http(s) URL that the full pipeline would return
# unchanged (modulo an empty path becoming "/"):
#   - lowercase scheme; host already lowercase, no leading/trailing dot,
#     no userinfo, optional :port
#   - path made only of chars that quote(safe="/%") passes through
#   - no query (sorting/plus-encoding could alter it), no fragment, no
#     spaces or "?"/"#" anywhere.
_FAST_URL = re.compile(
    r"^(?:http|https)://"
    r"(?![.])[a-z0-9.\-]*[a-z0-9\-](?::[0-9]*)?"
    r"(/[A-Za-z0-9/_.\-~%]*)?$"
)

# scheme-less, authority-less inputs whose normalization is a pure path
# transform: chars that quote(safe="/%") passes through, no query/fragment.
# "/a/b" -> itself; "a/b" -> "/a/b" (the urljoin("/") quirk makes them
# root-relative paths). Verified equivalent by the fuzz suite.
_FAST_PATH = re.compile(r"^[A-Za-z0-9/_.\-~%]*$")


def normalise_url(url: str, strip_default_ports: bool = False) -> str:
    """Canonicalize any URL string (see module docstring for the contract).

    >>> normalise_url('')
    '/'
    >>> normalise_url('www.EXAMPLE.com?hello=world')
    '/www.EXAMPLE.com?hello=world'
    >>> normalise_url('http://www.EXAMPLE.com?hello=world')
    'http://www.example.com/?hello=world'
    >>> normalise_url('?world=hello&hello=world')
    '/?hello=world&world=hello'
    """
    m = _FAST_URL.match(url)
    if m and not strip_default_ports:
        return url if m.group(1) else url + "/"
    if _FAST_PATH.match(url) and "//" not in url:
        # pure-path input: quote() is identity on this charset, no
        # components beyond the path -> leading-slash normalization only.
        # Excluded (slow path): dot segments, which urljoin("/") resolves,
        # and ANY "//" — a leading one is an authority, and urljoin
        # collapses some interior/trailing empty segments ("0//" -> "/0/").
        if "." not in url or not re.search(r"(?:^|/)\.{1,2}(?:/|$)", url):
            return url if url.startswith("/") else "/" + url
    # scheme-less inputs become root-relative paths: urljoin("/", ...) quirk
    url = urljoin("/", url)
    scheme, netloc, path, query, fragment = urlsplit(url)
    scheme = normalise_scheme(scheme)
    authority = normalise_authority(netloc)
    if strip_default_ports:
        authority = _strip_default_port(authority, scheme)
    return urlunsplit(
        (
            scheme,
            authority,
            normalise_path(path),
            normalise_query(query),
            normalise_fragment(fragment),
        )
    )


def normalise_url_many(urls, strip_default_ports: bool = False) -> list:
    """Batch canonicalizer for map_batches stages: list[str] -> list[str].

    Stateless and pure — runs as Ray tasks, not actors. URLs that fail to
    normalize (e.g. multi-@ netloc, invalid IPv6 literal) map to None so the
    calling stage can route them to the error side-output instead of killing
    the batch (the reference would raise mid-crawl; see SURVEY §3.1 step 4).
    """
    out = []
    fast = _FAST_URL.match
    if strip_default_ports:
        fast = lambda _u: None  # noqa: E731 — port strip disables fast path
    for u in urls:
        m = fast(u)
        if m is not None:
            out.append(u if m.group(1) else u + "/")
            continue
        try:
            out.append(normalise_url(u, strip_default_ports))
        except (ValueError, TypeError):
            out.append(None)
    return out


# bounded per-process memo for the hot extract/linkflow path: hrefs repeat
# heavily across pages (nav links, tree edges), and workers are
# single-threaded per task, so a plain dict is safe
_NORM_CACHE: dict = {}
_NORM_CACHE_MAX = 500_000


def normalise_url_cached(url: str) -> str:
    v = _NORM_CACHE.get(url)
    if v is None:
        v = normalise_url(url)
        if len(_NORM_CACHE) >= _NORM_CACHE_MAX:
            _NORM_CACHE.clear()
        _NORM_CACHE[url] = v
    return v


_COMPONENT_NORMALISERS = {
    "scheme": normalise_scheme,
    "host": normalise_host,
    "userinfo": normalise_userinfo,
    "authority": normalise_authority,
    "path": normalise_path,
    "query": normalise_query,
    "fragment": normalise_fragment,
    "url": normalise_url,
}


def normalise_component_kwargs(**kwargs) -> dict:
    """Normalize a dict of component values by component name.

    API parity with the reference's reflection helper
    (url_normalisation.py:245-263) used by ``filter_by``-style predicates:
    ``normalise_component_kwargs(scheme='HTTPS') -> {'scheme': 'https'}``.
    """
    return {k: _COMPONENT_NORMALISERS[k](v) for k, v in kwargs.items()}


# ---------------------------------------------------------------------------
# Raw-component operations (the reference's Hyperlink methods operate on the
# RAW input string, not the normalized one — order matters for trim→join)
# ---------------------------------------------------------------------------


def split_components(raw_url: str):
    """urlsplit of the RAW string (reference: Hyperlink.components,
    hyperlink.py:30-32)."""
    return urlsplit(raw_url)


def authority_of(raw_url: str) -> str:
    """Normalized authority of a raw URL (hyperlink.py:38-40).

    The same-host crawl filter compares this against the page's authority
    (crawler.py:140)."""
    return normalise_authority(urlsplit(raw_url).netloc)


# fast host extraction for the overwhelmingly-common canonical shape:
# scheme://host[:port] with an already-lowercase, no-edge-dot, no-userinfo
# host. Group 1 is exactly what the slow path returns (fuzz-proven
# equivalent in tests/test_canonicalize.py::test_url_host_fast_path).
_FAST_HOST = re.compile(
    r"^[A-Za-z][A-Za-z0-9+.\-]*://"
    r"(?![.])([a-z0-9\-]|[a-z0-9\-][a-z0-9.\-]*[a-z0-9\-])"
    r"(?::[0-9]*)?(?=[/?#]|$)"
)


def url_host(raw_url: str) -> str:
    """Normalized hostname (no userinfo, no port) — the frontier shard key."""
    m = _FAST_HOST.match(raw_url)
    if m:
        return m.group(1)
    auth = authority_of(raw_url)
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    return auth.rsplit(":", 1)[0] if re.search(r":[0-9]*$", auth) else auth


def trim_url(
    raw_url: str,
    scheme: bool = False,
    authority: bool = False,
    path: bool = False,
    query: bool = False,
    fragment: bool = False,
) -> str:
    """Drop components from the RAW url, returning a new RAW url string.

    Mirrors Hyperlink.trim (hyperlink.py:60-81): the split is on the raw
    input and the kept components stay raw — normalization happens later,
    when the result is used as a dedup key.
    """
    parts = urlsplit(raw_url)
    return urlunsplit(
        (
            "" if scheme else parts.scheme,
            "" if authority else parts.netloc,
            "" if path else parts.path,
            "" if query else parts.query,
            "" if fragment else parts.fragment,
        )
    )


def join_url(base_raw: str, href_raw: str) -> str:
    """Resolve href against base using the RAW strings (hyperlink.py:115-124).

    Returns the RAW resolution; the caller normalizes it separately. Using
    raw (not normalized) inputs is load-bearing: the reference joins
    ``urljoin(base._input_url, href._input_url)``.
    """
    return urljoin(base_raw, href_raw)


if __name__ == "__main__":
    import doctest

    doctest.testmod()
