"""Differential tests: raycrawl Hyperlink/HyperlinkSet vs the reference's
object API (simple_crawler/hyperlink.py, run from /root/reference — never
copied). Covers the full helper surface a reference user could call:
components, domain, with_path, trim, join, operators, factory TypeErrors,
set transforms."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from raycrawl.functions.hyperlink import (
    Hyperlink,
    HyperlinkSet,
    make_hyperlink,
    make_hyperlink_set,
)

ref_mod = pytest.importorskip("simple_crawler.hyperlink")

from tests.test_canonicalize import TRICKY  # noqa: E402

BASES = [
    "https://www.example.com",
    "https://www.example.com/a/b/",
    "http://example.com/x?q=1#f",
    "www.example.com/no-scheme",
]


@pytest.mark.parametrize("link", TRICKY)
def test_components_match_reference(link):
    ours, theirs = Hyperlink(link), ref_mod.Hyperlink(link)
    assert ours.url == theirs.url
    for comp in ("scheme", "authority", "path", "query", "fragment"):
        assert getattr(ours, comp) == getattr(theirs, comp), comp
    assert ours.is_absolute == theirs.is_absolute
    assert ours.is_relative == theirs.is_relative
    assert ours.domain.url == theirs.domain.url
    assert str(ours) == str(theirs)
    assert repr(ours) == repr(theirs)


@pytest.mark.parametrize("link", TRICKY)
@pytest.mark.parametrize("base", BASES)
def test_join_matches_reference(link, base):
    assert (
        Hyperlink(link).join(base).url
        == ref_mod.Hyperlink(link).join(base).url
    )


@pytest.mark.parametrize("link", TRICKY)
def test_trim_matches_reference(link):
    for kwargs in (
        {"query": True},
        {"fragment": True},
        {"query": True, "fragment": True},
        {"scheme": True, "authority": True},
        {"path": True},
    ):
        assert (
            Hyperlink(link).trim(**kwargs).url
            == ref_mod.Hyperlink(link).trim(**kwargs).url
        ), kwargs


def test_operators_and_with_path_match_reference():
    for base in BASES:
        assert (
            (Hyperlink(base) + "/suffix").url
            == (ref_mod.Hyperlink(base) + "/suffix").url
        )
        assert (
            (Hyperlink(base) / "child").url
            == (ref_mod.Hyperlink(base) / "child").url
        )
        assert (
            Hyperlink(base).with_path("/p/q").url
            == ref_mod.Hyperlink(base).with_path("/p/q").url
        )


def test_factory_type_errors_match_reference():
    h = make_hyperlink("https://example.com")
    assert make_hyperlink(h) is h
    for bad in (1, None, b"bytes", ["list"]):
        with pytest.raises(TypeError):
            make_hyperlink(bad)
        with pytest.raises(TypeError):
            ref_mod.make_hyperlink(bad)
    with pytest.raises(TypeError):
        make_hyperlink_set(42)
    with pytest.raises(TypeError):
        make_hyperlink_set([1, 2])
    s = make_hyperlink_set()
    assert s.is_empty() and not s.is_not_empty()
    with pytest.raises(TypeError):
        s.add("raw string")  # only Hyperlink objects (hyperlink.py:162-166)


def test_set_semantics_match_reference():
    links = ["https://EXAMPLE.com/a", "https://example.com/a", "/rel", "x?b=2&a=1"]
    ours = make_hyperlink_set(links)
    theirs = ref_mod.make_hyperlink_set(links)
    assert {h.url for h in ours} == {h.url for h in theirs}
    assert len(ours) == len(theirs)  # equal-normalized raw spellings collapse

    base = "https://www.example.com/dir/"
    assert {h.url for h in ours.join_all(base)} == {
        h.url for h in theirs.join_all(base)
    }
    assert {h.url for h in ours.trim(query=True)} == {
        h.url for h in theirs.trim(query=True)
    }
    assert {h.url for h in ours.filter_by(scheme="HTTPS")} == {
        h.url for h in theirs.filter_by(scheme="HTTPS")
    }
    assert {h.url for h in ours.filter_by(authority="example.com")} == {
        h.url for h in theirs.filter_by(authority="example.com")
    }


_URLISH = st.text(
    alphabet="abcXYZ019/.:?#&=%+_-~@ ", min_size=0, max_size=40
)


@given(_URLISH)
def test_fuzz_components_match_reference(link):
    ours, theirs = Hyperlink(link), ref_mod.Hyperlink(link)
    assert ours.url == theirs.url
    for comp in ("scheme", "authority", "path", "query", "fragment"):
        assert getattr(ours, comp) == getattr(theirs, comp), comp


@given(_URLISH, st.sampled_from(BASES))
def test_fuzz_join_matches_reference(link, base):
    assert (
        Hyperlink(link).join(base).url
        == ref_mod.Hyperlink(link).join(base).url
    )
