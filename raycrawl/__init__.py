"""raycrawl — a Ray-Data-native URL-frontier crawl & data-processing engine.

Brand-new engine with the query/data-processing capabilities of
jackwardell/SimpleCrawler (reference, read-only at /root/reference), built as
idiomatic ``ray.data.Dataset`` pipelines: zero-copy Arrow ``map_batches``
stages, actor pools for stateful components (URL-seen frontier shards with a
cuckoo filter, robots cache, fetch simulation over a Parquet corpus), and
iterative Dataset rounds for the BFS crawl loop.

Public surface (parity with the reference's de-facto API,
``/root/reference/simple_crawler/__init__.py:1-3``):

    from raycrawl import crawl, CrawlConfig
    from raycrawl import Hyperlink, make_hyperlink, make_hyperlink_set
    from raycrawl.functions.canonicalize import normalise_url
    from raycrawl.functions.extract import hrefs_from_html
"""

from raycrawl.config import CrawlConfig
from raycrawl.functions.hyperlink import (
    Hyperlink,
    HyperlinkSet,
    make_hyperlink,
    make_hyperlink_set,
)
from raycrawl.pipelines.crawl import crawl

__all__ = [
    "CrawlConfig",
    "crawl",
    "Hyperlink",
    "HyperlinkSet",
    "make_hyperlink",
    "make_hyperlink_set",
]
__version__ = "0.1.0"
