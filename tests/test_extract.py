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
    ]
    ours = {norm for _, norm in parse_page_hrefs(hrefs, base, trim_query, trim_fragment)}
    theirs = _ref_parse_hrefs(hrefs, base, trim_query, trim_fragment)
    assert ours == theirs


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
