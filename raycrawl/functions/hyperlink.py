"""Hyperlink / HyperlinkSet — the reference's object-level URL API.

The engine's dataflow is columnar (urls are string columns; see
functions/canonicalize.py for the batch kernels), but users of the
reference also call its object helpers directly
(/root/reference/simple_crawler/hyperlink.py:18-140, 143-248). This module
is that convenience surface, delegating every normalization decision to
the SAME byte-compatible kernels the pipeline uses — so object-level and
column-level results can never drift apart.

Contract parity covered by tests/test_hyperlink.py (differential against
the actual reference module):

* ``Hyperlink(link)``: ``url`` is the normalized form, component
  properties (scheme/authority/path/query/fragment) normalize lazily from
  the RAW input (hyperlink.py:30-52).
* ``domain`` / ``with_path`` / ``trim`` / ``join`` / ``__add__`` /
  ``__truediv__`` operate on the RAW input url, then re-normalize
  (hyperlink.py:54-85, 99-123) — raw-vs-normalized base matters for
  relative joins, which is why this distinction is load-bearing.
* ``make_hyperlink`` raises TypeError for non-str/non-Hyperlink inputs
  (hyperlink.py:127-140); ``make_hyperlink_set`` accepts iterables of
  str/Hyperlink and raises TypeError otherwise (hyperlink.py:232-248).
* set semantics: equality/hash on the NORMALIZED url, so two raw spellings
  of one url collapse in a HyperlinkSet (hyperlink.py:95-103).

NOT part of the crawl hot path: the pipeline never builds these objects
per row (that would be a per-row-Python anti-pattern); they exist for API
completeness and for users porting reference scripts.
"""

from __future__ import annotations

from typing import Iterable, Union
from urllib.parse import SplitResult, urljoin, urlsplit, urlunsplit

from raycrawl.functions.canonicalize import (
    normalise_authority,
    normalise_fragment,
    normalise_component_kwargs,
    normalise_path,
    normalise_query,
    normalise_scheme,
    normalise_url,
)

__all__ = [
    "Hyperlink",
    "HyperlinkSet",
    "make_hyperlink",
    "make_hyperlink_set",
]


class Hyperlink:
    """One href: normalized ``url`` plus component views over the raw input."""

    __slots__ = ("url", "_input_url")

    def __init__(self, link: str):
        self._input_url = link
        self.url = normalise_url(link)

    # ---- component views (normalize from the RAW input) -------------------
    @property
    def components(self) -> SplitResult:
        return urlsplit(self._input_url)

    @property
    def scheme(self) -> str:
        return normalise_scheme(self.components.scheme)

    @property
    def authority(self) -> str:
        return normalise_authority(self.components.netloc)

    @property
    def path(self) -> str:
        return normalise_path(self.components.path)

    @property
    def query(self) -> str:
        return normalise_query(self.components.query)

    @property
    def fragment(self) -> str:
        return normalise_fragment(self.components.fragment)

    @property
    def domain(self) -> "Hyperlink":
        """scheme + authority only (hyperlink.py:54-58)."""
        scheme, authority, *_ = self.components
        return Hyperlink(urlunsplit((scheme, authority, "", "", "")))

    @property
    def is_absolute(self) -> bool:
        return bool(self.scheme)

    @property
    def is_relative(self) -> bool:
        return not self.is_absolute

    # ---- derivations (operate on the RAW url, then re-normalize) ----------
    def trim(self, scheme: bool = False, authority: bool = False,
             path: bool = False, query: bool = False,
             fragment: bool = False) -> "Hyperlink":
        c = self.components
        return Hyperlink(
            urlunsplit(
                (
                    "" if scheme else c.scheme,
                    "" if authority else c.netloc,
                    "" if path else c.path,
                    "" if query else c.query,
                    "" if fragment else c.fragment,
                )
            )
        )

    def with_path(self, path: str) -> "Hyperlink":
        """join ``path`` onto this link's domain (hyperlink.py:83-85)."""
        return Hyperlink(self.domain.url + path)

    def join(self, base_url: Union[str, "Hyperlink"]) -> "Hyperlink":
        """Resolve self against ``base_url`` — urljoin on the RAW urls
        (hyperlink.py:110-123); relative bases behave like the reference."""
        base = make_hyperlink(base_url)
        return Hyperlink(urljoin(base._input_url, self._input_url))

    # ---- dunder surface ---------------------------------------------------
    def __str__(self) -> str:
        return self.url

    def __repr__(self) -> str:
        return f"Hyperlink('{self.url}')"

    def __eq__(self, other) -> bool:
        return isinstance(other, self.__class__) and self.url == other.url

    def __hash__(self) -> int:
        return hash(repr(self))

    def __add__(self, other) -> "Hyperlink":
        return Hyperlink(self._input_url + str(other))

    def __truediv__(self, other) -> "Hyperlink":
        return Hyperlink(self._input_url + "/" + str(other))


def make_hyperlink(link: Union[str, "Hyperlink"]) -> Hyperlink:
    """Factory with the reference's TypeError contract (hyperlink.py:127-140)."""
    if isinstance(link, Hyperlink):
        return link
    if not isinstance(link, str):
        raise TypeError("href links need to be strings")
    return Hyperlink(link)


class HyperlinkSet:
    """Set of Hyperlinks with bulk transforms (hyperlink.py:143-229)."""

    def __init__(self, collection: set | None = None):
        self.collection = collection or set()

    def __len__(self) -> int:
        return len(self.collection)

    def __iter__(self):
        return iter(self.collection)

    def __contains__(self, item) -> bool:
        return item in self.collection

    def __str__(self) -> str:
        return str(self.collection)

    def __repr__(self) -> str:
        return repr(self.collection)

    def __eq__(self, other) -> bool:
        return isinstance(other, self.__class__) and self.collection == other.collection

    def add(self, link) -> None:
        if not isinstance(link, Hyperlink):
            raise TypeError("link must be a Hyperlink")
        self.collection.add(link)

    def is_empty(self) -> bool:
        return len(self.collection) == 0

    def is_not_empty(self) -> bool:
        return not self.is_empty()

    def join_all(self, base_url: Union[str, Hyperlink]) -> "HyperlinkSet":
        base = make_hyperlink(base_url)
        return HyperlinkSet({link.join(base) for link in self.collection})

    def filter_by(self, **kwargs) -> "HyperlinkSet":
        """Keep links whose NORMALIZED components equal the (normalized)
        kwargs — scheme/authority/path/query/fragment (hyperlink.py:198-213)."""
        kwargs = normalise_component_kwargs(**kwargs)
        return HyperlinkSet(
            {
                link
                for link in self.collection
                if all(getattr(link, k) == v for k, v in kwargs.items())
            }
        )

    def trim(self, **kwargs) -> "HyperlinkSet":
        return HyperlinkSet({href.trim(**kwargs) for href in self.collection})


def make_hyperlink_set(links: Iterable | None = None) -> HyperlinkSet:
    """Factory with the reference's TypeError contract (hyperlink.py:232-248)."""
    if links is None:
        return HyperlinkSet()
    if not isinstance(links, Iterable):
        raise TypeError("links must be iterable")
    out = set()
    for link in links:
        if not isinstance(link, (Hyperlink, str)):
            raise TypeError("links must all be Hyperlink objects")
        out.add(make_hyperlink(link))
    return HyperlinkSet(out)
