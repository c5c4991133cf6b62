"""Differential tests: our href extractor vs the reference HTML parser."""

import pytest

from raycrawl.functions.extract import (
    ExtractError,
    extract_edges_rows,
    hrefs_from_html,
    page_text,
)
from raycrawl.functions.linkflow import parse_page_hrefs

ref_parser = pytest.importorskip("simple_crawler.parser")
ref_crawler = pytest.importorskip("simple_crawler.crawler")
ref_hyperlink = pytest.importorskip("simple_crawler.hyperlink")


def make_html(body: str) -> str:
    return f"<html><head></head><body>{body}</body></html>"


HTML_CASES = [
    make_html('<a href="/hello">x</a>'),
    make_html('<a href="/a">1</a><br><a href="/b">2</a>'),
    make_html('<a href="/dup">1</a><a href="/dup">2</a>'),
    make_html('<a href="/a">1</a><a href="/A">2</a>'),  # case-distinct paths
    make_html('<A HREF="/upper">caps</A>'),
    make_html('<a class="x" href="/attr" id="y">attrs</a>'),
    make_html('<a href="/two" href="/attrs">dup attr</a>'),
    make_html('<a href="">empty</a>'),
    make_html('<a href="hello world">space</a>'),
    make_html('<a href="?with=query">q</a>'),
    make_html('<a href="#frag">f</a>'),
    make_html('<a href="/x?b=2&amp;a=1#z">entity</a>'),
    make_html('<a href="http://other.example.com/abs">abs</a>'),
    make_html('<a href="//proto.example.com/rel">pr</a>'),
    make_html('<a href="mailto:x@example.com">m</a>'),
    make_html("<!-- <a href='/commented'>no</a> --><a href='/real'>yes</a>"),
    make_html('<script>var a = \'<a href="/scripted">no</a>\';</script>'),
    make_html('<div><p><a href="/nested">deep</a></p></div>'),
    make_html('<a id="no-href">none</a>'),
    make_html('<a href="/unclosed">text<a href="/second">'),
    make_html('<a href="%C3%A9">enc</a><a href="é">raw</a>'),
    "<a href='/no-body-wrapper'>bare</a>",
    "",
    "plain text, no tags",
]


@pytest.mark.parametrize("html", HTML_CASES)
def test_hrefs_match_reference_set(html):
    ours_norm = {
        str(ref_hyperlink.make_hyperlink(h)) for h in hrefs_from_html(html)
    }
    theirs = {str(link) for link in ref_parser.get_hrefs_from_html(html)}
    assert ours_norm == theirs


@pytest.mark.parametrize("html", HTML_CASES)
def test_page_text_byte_identical(html):
    """page_text == reference's sorted newline-joined normalized hrefs."""
    theirs = "\n".join(sorted(str(l) for l in ref_parser.get_hrefs_from_html(html)))
    assert page_text(html).encode() == theirs.encode()


def test_valueless_href_is_extract_error():
    # the reference raises TypeError deep in make_hyperlink; we surface a
    # typed error for deterministic row routing
    html = make_html("<a href>bad</a>")
    with pytest.raises(TypeError):
        ref_parser.get_hrefs_from_html(html)
    with pytest.raises(ExtractError):
        hrefs_from_html(html)


def test_extract_edges_rows_batch_and_error_routing():
    htmls = [
        make_html('<a href="/a">1</a><a href="/b">2</a>').encode(),
        make_html("<a href>bad</a>").encode(),
        make_html("").encode(),
    ]
    srcs = ["http://h/x", "http://h/y", "http://h/z"]
    src_out, raw, norm, err_src, err_msg = extract_edges_rows(srcs, htmls)
    assert src_out == ["http://h/x", "http://h/x"]
    assert norm == ["/a", "/b"]
    assert err_src == ["http://h/y"]
    assert "href" in err_msg[0]


def _ref_parse_hrefs(hrefs, base, trim_query=True, trim_fragment=True):
    """Drive the reference's _parse_hrefs composition directly."""
    crawler = ref_crawler.Crawler(trim_query=trim_query, trim_fragment=trim_fragment)
    href_set = ref_hyperlink.make_hyperlink_set([ref_hyperlink.make_hyperlink(h) for h in hrefs])
    out = crawler._parse_hrefs(href_set, ref_hyperlink.make_hyperlink(base))
    return {str(l) for l in out}


@pytest.mark.parametrize("trim_query,trim_fragment", [(True, True), (False, False), (True, False), (False, True)])
def test_parse_page_hrefs_matches_reference(trim_query, trim_fragment):
    base = "http://www.example.com/section/page"
    hrefs = [
        "/world",
        "hello",
        "../up",
        "./here",
        "http://www.example.com/absolute",
        "http://OTHER.example.com/offsite",
        "https://www.example.com/other-scheme",  # different scheme, same authority
        "?with=query",
        "#frag",
        "/x?a=1#f",
        "/x?b=2&a=1",
        "/dup",
        "/dup",
        "hello world",
        "//www.example.com/protocol-relative",
        "//cdn.example.com/offsite-pr",
        "mailto:x@example.com",
        "http://www.example.com/x;",  # lone trailing ";": urljoin drops it
        "/y;",
        "/ok;params",
    ]
    ours = {norm for _, norm in parse_page_hrefs(hrefs, base, trim_query, trim_fragment)}
    theirs = _ref_parse_hrefs(hrefs, base, trim_query, trim_fragment)
    assert ours == theirs


from hypothesis import given, settings
from hypothesis import strategies as st

_href_tokens = list("abcP059._~%-/?#=&:;") + [
    "../", "./", "http://www.example.com/", "//cdn.example.com/", "hello world",
    # exercise the absolute-href fast join (same/cross scheme, ports,
    # degenerate trailing ?/# forms that must fall back to urljoin)
    "https://www.example.com/", "http://www.example.com:8080/",
    "http://www.example.com", "http://www.EXAMPLE.com/",
    # ";params" edge: urljoin drops a lone trailing ";" from the last path
    # segment (empty params) — the fast paths must defer to urljoin here
    "http://www.example.com/x;", "/x;", "x;",
]
_href_st = st.lists(st.sampled_from(_href_tokens), max_size=10).map("".join)
_base_st = st.sampled_from(
    [
        "http://www.example.com/",
        "http://www.example.com/a/b",
        "http://www.example.com/a/b/",
        "http://www.example.com/a/../b",
        "http://www.example.com",
        "http://www.example.com/x?q=1#f",
        "http://User@www.Example.com:8080/p",
    ]
)


@settings(max_examples=300, deadline=None)
@given(_base_st, st.lists(_href_st, max_size=6))
def test_parse_page_hrefs_fuzz_matches_reference(base, hrefs):
    """Fuzz the trim/join fast paths against the reference composition.

    Inputs where two raw hrefs share a normalized trimmed form but join to
    DIFFERENT urls are skipped: there the reference's own result depends on
    set-iteration order (hash seed) — SURVEY §4. Our engine picks
    deterministically (first-wins); the reference picks arbitrarily."""
    from raycrawl.functions.canonicalize import (
        join_url,
        normalise_url,
        trim_url,
    )

    groups = {}
    try:
        for h in hrefs:
            t = trim_url(h, query=True, fragment=True)
            groups.setdefault(normalise_url(t), set()).add(
                normalise_url(join_url(base, t))
            )
    except ValueError:
        return
    if any(len(v) > 1 for v in groups.values()):
        return  # reference-ambiguous input

    try:
        theirs = _ref_parse_hrefs(hrefs, base)
    except ValueError:
        return  # reference itself rejects (multi-@ authority etc.)
    ours = {norm for _, norm in parse_page_hrefs(hrefs, base)}
    assert ours == theirs


_html_tokens = [
    "<a ", ">", '"', "href", "=", "x", " ", "<b", "</a>", "<A HREF",
    'href="/p1"', "&amp;", "<!--", "-->", "<script>", "</script>", "<",
    "class", "'", "/", "y z", "<a", "=\"q\"", "\n",
]
_html_st = st.lists(st.sampled_from(_html_tokens), max_size=14).map("".join)


@settings(max_examples=600, deadline=None)
@given(_html_st)
def test_fast_href_path_agrees_with_parser(html):
    """_fast_hrefs (when it accepts a page) must equal HTMLParser raws."""
    from raycrawl.functions.extract import _AnchorHrefs, _fast_hrefs

    fast = _fast_hrefs(html)
    if fast is None:
        return  # gate fell back — parser path is the reference-equal one
    p = _AnchorHrefs()
    try:
        p.feed(html)
    except ExtractError:
        raise AssertionError(f"fast path accepted a page the parser rejects: {html!r}")
    assert fast == p.hrefs, html


def test_parse_page_hrefs_deterministic_order():
    base = "http://h.example.com/p"
    hrefs = ["/b", "/a", "/b", "/c?x=1", "/c#f", "/c"]
    out1 = parse_page_hrefs(hrefs, base)
    out2 = parse_page_hrefs(list(hrefs), base)
    assert out1 == out2
    # first-wins in document order
    assert [n for _, n in out1] == [
        "http://h.example.com/b",
        "http://h.example.com/a",
        "http://h.example.com/c",
    ]
