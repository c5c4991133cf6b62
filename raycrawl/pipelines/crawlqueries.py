"""Crawl-family query entry points over sf-scaled synthetic corpora.

The driver's tables (TPC-H-ish) are not web-shaped; the crawl queries run
over the deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1,
BASELINE.json input_hint schema), cached under /tmp/raycrawl_corpus/<sf>
keyed by the sf name so the Ray query and the DuckDB oracle (which reads
the same parquet files by literal path) see identical bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raycrawl.config import CrawlConfig
from raycrawl.functions.extract import (
    extract_edges_rows,
    hrefs_with_norm,
    page_text,
)
from raycrawl.functions.linkflow import parse_page_hrefs
from raycrawl.pipelines.crawl import crawl
from raycrawl.sources.synth import generate_corpus

__all__ = ["corpus_for", "crawl_bfs", "crawl_edges", "crawl_text_identity",
           "crawl_host_stats", "crawl_filter_by", "crawl_pagerank",
           "crawl_triangles", "crawl_components", "crawl_degree_hist",
           "crawl_budget_alloc", "crawl_url_templates", "crawl_hits",
           "crawl_recrawl_priority", "crawl_outlink_spam",
           "CORPUS_ROOT", "SCALES"]

CORPUS_ROOT = "/tmp/raycrawl_corpus"

# sf name -> (n_hosts, pages_per_host); sizes keep the sf ratios meaningful
SCALES = {
    "sf0.001": (2, 32),
    "sf0.01": (4, 64),
    "sf0.1": (8, 2000),
}


def corpus_for(sf_dir: str) -> dict:
    """Deterministic corpus for an sf dir (generated once, cached)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    n_hosts, pages = SCALES.get(name, (2, 32))
    out = os.path.join(CORPUS_ROOT, name)
    marker = os.path.join(out, "COMPLETE.v3")
    if not os.path.exists(marker):
        # relative_links=False: the SQL BFS oracle models joins from the
        # normalized text lines, which is exact only for base-independent
        # href forms (see sources/synth.py docstring)
        info = generate_corpus(out, n_hosts=n_hosts, pages_per_host=pages,
                               seed=42, relative_links=False)
        with open(marker, "w") as f:
            f.write(str(info["n_rows"]))
    return {
        "corpus": os.path.join(out, "corpus"),
        "seeds": os.path.join(out, "seeds.parquet"),
    }


_NON_HTML_SUFFIXES = (".pdf", ".png", ".css", "/robots.txt")


def _is_html_url(url: str) -> bool:
    return not any(url.endswith(s) for s in _NON_HTML_SUFFIXES)


def crawl_bfs(sf_dir: str, **config_kw) -> pa.Table:
    """Full BFS crawl of the sf corpus from its seeds: (url_norm, depth).

    The flagship pipeline (frontier shards + robots gate + fetch-sim +
    extract rounds). Oracle: recursive-CTE BFS over the same corpus parquet
    (__ray_entry__.oracle_sql)."""
    info = corpus_for(sf_dir)
    res = crawl(info["corpus"], info["seeds"],
                CrawlConfig(num_shards=4, fetch_concurrency=4, **config_kw))
    done = res.done_table()
    return pa.table(
        {
            "url_norm": done["url_norm"],
            "depth": pa.array(
                [int(d) for d in done["depth"].to_pylist()], pa.int64()
            ),
        }
    )


def crawl_bfs_with_query(sf_dir: str) -> pa.Table:
    """crawl_bfs with trim_query=False/trim_fragment=False: query strings
    survive to the fetch (the sorted-query corpus page becomes reachable),
    fragments are stripped at the transport boundary. Own CTE oracle."""
    return crawl_bfs(sf_dir, trim_query=False, trim_fragment=False)


def crawl_edges(sf_dir: str) -> rd.Dataset:
    """The minimum end-to-end slice (SURVEY §7 step 3): corpus parquet ->
    map_batches(extract+canonicalize) -> edge rows. Stateless tasks, no
    shuffle, streaming end to end."""
    info = corpus_for(sf_dir)

    def extract(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        htmls = t["html"].to_pylist()
        keep_u, keep_h = [], []
        for u, h in zip(urls, htmls):
            if _is_html_url(u):
                keep_u.append(u)
                keep_h.append(h)
        src, _raw, norm, _es, _em = extract_edges_rows(keep_u, keep_h)
        return pa.table(
            {
                "src_url": pa.array(src, pa.string()),
                "href_norm": pa.array(norm, pa.string()),
            }
        )

    return rd.read_parquet(info["corpus"], columns=["url", "html"]).map_batches(
        extract, batch_format="pyarrow"
    )


def crawl_edges_joined(sf_dir: str) -> rd.Dataset:
    """(src_url, cand_norm): the full per-page linkflow composition —
    extract -> trim(query,fragment) -> join(base) -> same-authority filter
    (crawler.py:132-143) — over every html corpus page, as a stateless
    streaming map. Oracle: the same transform over the golden text lines."""
    info = corpus_for(sf_dir)

    def flow(t: pa.Table) -> pa.Table:
        src_out, cand_out = [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            if not _is_html_url(url):
                continue
            try:
                pairs = hrefs_with_norm(bytes(html).decode("utf-8"))
            except Exception:
                continue
            for _, norm in parse_page_hrefs([r for r, _ in pairs], url):
                src_out.append(url)
                cand_out.append(norm)
        return pa.table(
            {
                "src_url": pa.array(src_out, pa.string()),
                "cand_norm": pa.array(cand_out, pa.string()),
            }
        )

    return rd.read_parquet(info["corpus"], columns=["url", "html"]).map_batches(
        flow, batch_format="pyarrow"
    )


def crawl_degree_hist(sf_dir: str) -> rd.Dataset:
    """(degree, n_pages): the out-degree distribution of the link graph —
    the aggregate-of-an-aggregate shape (per-page degree, then a histogram
    over degrees). Built on :func:`crawl_edges_joined`'s streaming
    linkflow; the first groupby shuffles one row per (page, link-target)
    — the same cost any degree computation pays — and the histogram pass
    is a per-batch bincount partial into a degree-domain-sized groupby.
    Pages with zero same-authority out-links don't appear (SQL GROUP BY
    over edges has the same semantics)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    deg = (
        crawl_edges_joined(sf_dir)
        .groupby("src_url")
        .aggregate(Count(alias_name="degree"))
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"degree": pc.cast(t["degree"], pa.int64())})
            .group_by("degree")
            .aggregate([("degree", "count")])
        )
        return g.rename_columns(["degree", "n_pages"])

    return (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_pages", alias_name="n_pages"))
    )


def crawl_host_stats(sf_dir: str) -> rd.Dataset:
    """Pages + text volume per host over the corpus: the crawl-side grouped
    aggregate (vectorized host extraction, partial pre-agg, tiny shuffle)."""
    import pyarrow.compute as pc

    info = corpus_for(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        hosts = pc.struct_field(
            pc.extract_regex(t["url"], r"^http://(?P<host>[^/]+)"), "host"
        )
        g = pa.table(
            {
                "host": hosts,
                "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        ).group_by("host").aggregate([("text_len", "count"), ("text_len", "sum")])
        return g.rename_columns(["host", "n_pages", "total_text_chars"])

    from ray.data.aggregate import Sum

    return (
        rd.read_parquet(info["corpus"], columns=["url", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("total_text_chars", alias_name="total_text_chars"),
        )
    )


# canonical authority fast path (VERDICT r2 #7). RE2 (pyarrow's engine)
# has no lookarounds, so the "no '@', no ASCII uppercase, no non-ASCII,
# no edge dots" check is spelled with byte-range classes:
#   C (any allowed char)  = [\x00-\x3f\x5b-\x7f]   (excludes @, A-Z, >=0x80)
#   E (allowed edge char) = C minus '.'
# For an authority matching E(C*E)? (or empty), lower()/strip('.')/userinfo
# handling are all no-ops, so authority_of(url) == the raw netloc verbatim.
_AUTH_EXTRACT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<auth>[^/?#]*)"
_AUTH_FAST_RE = (
    r"^(?:[\x00-\x2d\x2f-\x3f\x5b-\x7f]"
    r"(?:[\x00-\x3f\x5b-\x7f]*[\x00-\x2d\x2f-\x3f\x5b-\x7f])?)?$"
)


def authority_keep_mask(urls: pa.Array, want: str) -> pa.Array:
    """Vectorized ``authority_of(u) == want`` over a url column: RE2
    netloc extraction + charset check cover the overwhelmingly-common
    canonical shape; only rows failing the shape fall back to the scalar
    normalizer (fuzz-proven equivalent in tests/test_ops.py)."""
    import numpy as np
    import pyarrow.compute as pc

    from raycrawl.functions.canonicalize import authority_of

    urls = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    auth = pc.struct_field(pc.extract_regex(urls, _AUTH_EXTRACT_RE), "auth")
    fast = pc.fill_null(pc.match_substring_regex(auth, _AUTH_FAST_RE), False)
    keep = pc.fill_null(
        pc.and_(fast, pc.equal(auth, pa.scalar(want, pa.string()))), False
    ).to_numpy(zero_copy_only=False).copy()
    slow_idx = np.flatnonzero(
        ~fast.to_numpy(zero_copy_only=False)
    )
    if slow_idx.size:
        lst = urls.to_pylist()
        for k in slow_idx:
            keep[k] = authority_of(lst[k]) == want
    return pa.array(keep, pa.bool_())


def crawl_filter_by(sf_dir: str, authority: str = "h0.example.com") -> rd.Dataset:
    """filter_by(authority=...) parity (reference HyperlinkSet.filter_by,
    hyperlink.py:195-209): keep corpus urls whose normalized authority
    equals the (normalized) requested one. Kwargs normalize through the
    same component dispatcher as the reference (M3)."""
    from raycrawl.functions.canonicalize import normalise_component_kwargs

    info = corpus_for(sf_dir)
    want = normalise_component_kwargs(authority=authority)["authority"]

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(authority_keep_mask(t["url"], want)).select(["url"])

    return rd.read_parquet(info["corpus"], columns=["url"]).map_batches(
        keep, batch_format="pyarrow"
    )


def crawl_text_identity(sf_dir: str) -> pa.Table:
    """Recompute every html page's extraction and compare byte-for-byte to
    the corpus golden ``text`` column: (n_pages, n_match). The oracle
    asserts n_match == n_pages — any extractor drift fails the compare."""
    info = corpus_for(sf_dir)

    def check(t: pa.Table) -> pa.Table:
        n_pages = n_match = 0
        for u, h, txt in zip(
            t["url"].to_pylist(), t["html"].to_pylist(), t["text"].to_pylist()
        ):
            if not _is_html_url(u):
                continue
            n_pages += 1
            recomputed = page_text(bytes(h).decode("utf-8"))
            if recomputed.encode() == (txt or "").encode():
                n_match += 1
        return pa.table(
            {
                "n_pages": pa.array([n_pages], pa.int64()),
                "n_match": pa.array([n_match], pa.int64()),
            }
        )

    parts = rd.read_parquet(info["corpus"], columns=["url", "html", "text"]).map_batches(
        check, batch_format="pyarrow"
    )
    agg = parts.sum(["n_pages", "n_match"])  # tiny driver-side reduction
    return pa.table(
        {
            "n_pages": pa.array([agg["sum(n_pages)"]], pa.int64()),
            "n_match": pa.array([agg["sum(n_match)"]], pa.int64()),
        }
    )


def _cand_edges(sf_dir: str):
    """(cand, nodes, n_parts): the distinct extracted link set BEFORE
    closing over corpus pages — shared by :func:`_link_edges` (which
    inner-joins against pages) and :func:`crawl_dead_links` (which
    anti-joins)."""
    from ray.data.aggregate import Count

    from raycrawl.pipelines.dedup import clean_blocks, doc_blocks

    info = corpus_for(sf_dir)
    n_parts = max(4, doc_blocks(sf_dir))
    nodes = rd.read_parquet(info["corpus"], columns=["url"])

    def flow(t: pa.Table) -> pa.Table:
        src_out, dst_out = [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            if not _is_html_url(url):
                continue
            try:
                pairs = hrefs_with_norm(bytes(html).decode("utf-8"))
            except Exception:
                continue
            for _, norm in parse_page_hrefs(
                [r for r, _ in pairs], url, filter_authority=False
            ):
                if norm != url:
                    src_out.append(url)
                    dst_out.append(norm)
        return pa.table(
            {
                "src": pa.array(src_out, pa.string()),
                "dst": pa.array(dst_out, pa.string()),
            }
        )

    from raycrawl.pipelines.dedup import coarse_distinct, coarse_parts

    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    # distinct edges: coarse-hash partition + pandas C drop_duplicates —
    # a native groupby((src, dst)) emits one group per DISTINCT EDGE and
    # Ray's aggregate costs ~10 s per 0.4M groups (see coarse_distinct)
    cand = clean_blocks(
        coarse_distinct(
            rd.read_parquet(info["corpus"], columns=["url", "html"])
            .map_batches(flow, batch_format="pyarrow"),
            ["src", "dst"],
            coarse_parts(sf_dir) - 1,
        ),
        edge_schema,
    )
    return cand, nodes, n_parts


def _link_edges(sf_dir: str):
    """(edges, nodes, n_parts): the distinct resolved link graph shared by
    the graph-analytics queries (pagerank, triangles) — cross-host edges
    kept (``parse_page_hrefs`` with ``filter_authority=False``), self
    loops dropped, closed over corpus pages by a partitioned hash join
    (never a driver-side set)."""
    from raycrawl.pipelines.dedup import clean_blocks

    cand, nodes, n_parts = _cand_edges(sf_dir)
    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    edges = clean_blocks(
        cand
        .join(
            nodes.map_batches(
                lambda t: pa.table({"node": t["url"]}), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=n_parts,
            on=("dst",),
            right_on=("node",),
        )
        .select_columns(["src", "dst"]),
        edge_schema,
    )
    return edges, nodes, n_parts


def crawl_triangles(sf_dir: str) -> pa.Table:
    """(n_und_edges, n_triangles): triangle count over the undirected,
    deduplicated link graph — the classic distributed graph-analytics
    join plan: canonicalize each edge to (a, b) with a < b (node-iterator
    ordering — every triangle counted exactly once), build wedges by ONE
    hash join (x<y joined to y<z on the middle vertex), close them with a
    second hash join against the edge set on the composite (x, z) key.
    All joins are Ray-native hash-partitioned; the driver sees only the
    two final counts. At web scale the wedge join is skew-sensitive (hub
    vertices); the standard mitigation — orient edges from lower- to
    higher-degree endpoints instead of lexicographically — drops in at the
    canonicalization step without changing the plan."""
    from ray.data.aggregate import Count

    from raycrawl.pipelines.dedup import clean_blocks

    edges, _nodes, n_parts = _link_edges(sf_dir)

    def undirect(t: pa.Table) -> pa.Table:
        lt = pc.less(t["src"], t["dst"])
        return pa.table(
            {
                "a": pc.if_else(lt, t["src"], t["dst"]),
                "b": pc.if_else(lt, t["dst"], t["src"]),
            }
        )

    und_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    und = clean_blocks(
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"]),
        und_schema,
    ).materialize()  # reused by both joins; blocks stay in plasma
    n_und = und.count()

    # second-hop copy renamed (b, c): join keys share the name "b", so the
    # wedge result carries distinct columns (a, b, c) with a < b < c
    hop = clean_blocks(
        und.map_batches(
            lambda t: pa.table({"b": t["a"], "c": t["b"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("b", pa.string()), ("c", pa.string())]),
    )
    # clean_blocks before the closing join: empty wedge partitions are
    # schema-less and racily poison the composite-key join (the Ray 2.49
    # empty-block join edge)
    wedges = clean_blocks(
        und.join(hop, join_type="inner", num_partitions=n_parts,
                 on=("b",)),
        pa.schema(
            [("a", pa.string()), ("b", pa.string()), ("c", pa.string())]
        ),
    )
    # closing edge: (a, c) must be an edge — composite-key hash join
    closer = clean_blocks(
        und.map_batches(
            lambda t: pa.table({"a": t["a"], "c": t["b"]}),
            batch_format="pyarrow",
        ),
        pa.schema([("a", pa.string()), ("c", pa.string())]),
    )
    tri_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("c", pa.string())]
    )
    triangles = clean_blocks(
        wedges.join(closer, join_type="inner", num_partitions=n_parts,
                    on=("a", "c")),
        tri_schema,
    )
    return pa.table(
        {
            "n_und_edges": pa.array([n_und], pa.int64()),
            "n_triangles": pa.array([triangles.count()], pa.int64()),
        }
    )


def crawl_components(sf_dir: str, max_iters: int = 64,
                     graph: tuple | None = None) -> rd.Dataset:
    """(url, component): weakly-connected components of the link graph —
    every corpus page labeled with the lexicographically smallest url of
    its component (isolated pages label themselves).

    Distributed min-label propagation as coarse-partition MESSAGE PASSING
    — no per-round ``Dataset.join`` (its hash-shuffle aggregator actor
    pool costs seconds of startup per call, measured ~6 s/round on this
    graph): each round is ONE lazy chain of two grouped shuffles over a
    64-way hash partition, with C-speed pandas merges inside the
    partitions. Phase A delivers each node's label to its out-neighbors
    (label rows and edge rows co-partitioned by the destination's hash,
    pandas merge emits (neighbor, label) messages and passes the label
    rows through); phase B re-partitions by receiving node and takes the
    per-node min over {own label} ∪ messages, emitting the changed-count
    partials alongside (string labels have no monotone sum, so the exact
    fixpoint test is this count reaching zero). Rounds >= 2 also send
    POINTER-DOUBLING requests (key=L(x), src=x rides the same shuffle as
    the edge rows, delivering L(L(x)) — monotone since L(y) <= y), so deep
    graphs converge in O(log diameter) rounds and the max_iters raise is a
    pure safety net. The sf0.1 graph's diameter is 4 (37 s -> ~31 s vs the
    join-based variant at sf0.1 — the remaining wall time is Ray Data's
    fixed per-shuffle floor x 2 shuffles x rounds, which amortizes at
    real data scale where shuffle time is data-bound)."""
    from raycrawl.pipelines.dedup import clean_blocks

    P = 64
    if graph is None:
        edges, nodes, _ = _link_edges(sf_dir)
    else:  # injectable (edges, nodes) for synthetic-graph tests
        edges, nodes = graph

    def _part(vals: np.ndarray) -> np.ndarray:
        return (pd.util.hash_array(vals.astype(object)) % P).astype(np.int64)

    # static symmetric edge rows, pre-partitioned by the DESTINATION node's
    # hash (where the dst's label lives in phase A): (kpart, key=dst, src)
    def sym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        key = np.concatenate([d, s])
        src = np.concatenate([s, d])
        return pa.table(
            {
                "kpart": pa.array(_part(key), pa.int64()),
                "key": pa.array(key, pa.string()),
                "src": pa.array(src, pa.string()),
            }
        )

    sym_edges = clean_blocks(
        edges.map_batches(sym, batch_format="pyarrow"),
        pa.schema([("kpart", pa.int64()), ("key", pa.string()),
                   ("src", pa.string())]),
    ).materialize()

    label_schema = pa.schema([("node", pa.string()), ("label", pa.string())])
    labels = clean_blocks(
        nodes.map_batches(
            lambda t: pa.table({"node": t["url"], "label": t["url"]}),
            batch_format="pyarrow",
        ),
        label_schema,
    ).materialize()

    def as_label_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kpart": pa.array(_part(node), pa.int64()),
                "key": t["node"],
                "src": pa.nulls(len(t), pa.string()),
                "label": t["label"],
            }
        )

    def as_pointer_rows(t: pa.Table) -> pa.Table:
        # pointer-doubling requests: deliver L(L(x)) back to x — same row
        # shape as the edge rows, riding the same two-shuffle chain
        lab = t["label"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kpart": pa.array(_part(lab), pa.int64()),
                "key": t["label"],
                "src": t["node"],
            }
        )

    def deliver(g: pd.DataFrame) -> pd.DataFrame:
        # label rows (src null) hold THE label of every key in this
        # partition; edge rows pick it up for their src — one C merge
        labs = g[g["src"].isna()][["key", "label"]]
        msgs = g[g["src"].notna()][["key", "src"]].merge(labs, on="key")
        own = labs.rename(columns={"key": "node"})
        out = pd.concat(
            [own.assign(is_own=True),
             msgs[["src", "label"]].rename(columns={"src": "node"})
             .assign(is_own=False)],
            ignore_index=True,
        )
        out["npart"] = pd.util.hash_array(
            out["node"].to_numpy(object)) % P
        return out[["npart", "node", "label", "is_own"]]

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("node")["label"].min()
        old = g[g["is_own"]].set_index("node")["label"]
        changed = int((new != old.reindex(new.index)).sum())
        out = new.reset_index()
        out["changed"] = np.int64(0)
        if len(out):
            out.loc[0, "changed"] = changed
        return out[["node", "label", "changed"]]

    for it in range(max_iters):
        req = sym_edges
        if it >= 2:  # deep graph: add the doubling hop (label values are
            # node urls, so every request finds its label row)
            req = req.union(
                labels.map_batches(as_pointer_rows, batch_format="pyarrow")
            )
        merged = clean_blocks(
            req.union(
                labels.map_batches(as_label_rows, batch_format="pyarrow")
            )
            .groupby("kpart")
            .map_groups(deliver, batch_format="pandas")
            .groupby("npart")
            .map_groups(reduce_min, batch_format="pandas"),
            pa.schema([("node", pa.string()), ("label", pa.string()),
                       ("changed", pa.int64())]),
        ).materialize()
        diff = merged.sum("changed")  # scan over in-plasma blocks
        labels = clean_blocks(
            merged.map_batches(
                lambda t: t.select(["node", "label"]), batch_format="pyarrow"
            ),
            label_schema,
        )
        if not diff:
            break
    else:
        raise RuntimeError(
            f"component label propagation did not converge in {max_iters} "
            f"rounds (a component's diameter exceeds it)"
        )

    return labels.map_batches(
        lambda t: pa.table({"url": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def crawl_pagerank(sf_dir: str, iters: int = 4, k: int = 20) -> rd.Dataset:
    """(url, rank_scaled): top-k pages by PageRank over the FULL resolved
    link graph (cross-host edges kept — ``parse_page_hrefs`` with
    ``filter_authority=False``), in pure int64 arithmetic so a DuckDB
    oracle reproduces every bit. See :func:`_pagerank_ranks` for the plan."""
    ranks = _pagerank_ranks(sf_dir, iters)
    return ranks.sort(["rank_scaled", "url"], descending=[True, False]).limit(k)


def _pagerank_ranks(sf_dir: str, iters: int = 4,
                    graph=None) -> rd.Dataset:
    """(url, rank_scaled) for EVERY page — the full rank table the top-k
    query and the frontier-priority composition both consume.

    r_0 = 1e12 per node; r_{i+1}(v) = 0.15e12 + (85 * sum over in-edges
    of r_i(u) // outdeg(u)) // 100, dangling mass dropped — an explicit,
    deterministic variant (floor division is identical in numpy and SQL).

    Scale shape: the same iterated hash-join + grouped-sum skeleton as
    dedup's distributed label propagation — per iteration one
    edges-to-ranks join and one groupby-sum, both partitioned; the driver
    holds only loop control. Edges/outdegrees materialize ONCE (they are
    loop-invariant; blocks stay in plasma) and every per-node table is a
    Dataset, never a driver structure. iters is FIXED (graph-analytics
    checkpointable rounds), not run to convergence."""
    from ray.data.aggregate import Count, Sum

    from raycrawl.pipelines.dedup import clean_blocks

    scale = 10**12
    base = 15 * scale // 100
    edges, nodes, n_parts = graph if graph is not None else _link_edges(sf_dir)
    deg_schema = pa.schema([("src", pa.string()), ("deg", pa.int64())])
    deg = clean_blocks(
        edges.groupby("src").aggregate(Count(alias_name="deg")), deg_schema
    )
    ed_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("deg", pa.int64())]
    )
    # loop-invariant: materialize once, reuse every iteration
    edges_deg = clean_blocks(
        edges.join(deg, join_type="inner", num_partitions=n_parts,
                   on=("src",), right_on=("src",)),
        ed_schema,
    ).materialize()

    rank_schema = pa.schema([("url", pa.string()), ("rank_scaled", pa.int64())])

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "rank_scaled": pa.array([scale] * len(t), pa.int64()),
            }
        )

    def zero_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": t["url"],
                "contrib": pa.array([0] * len(t), pa.int64()),
            }
        )

    def edge_contrib(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": t["dst"],
                # int64/int64 pc.divide IS integer division (non-negative
                # here, so trunc == floor == SQL //)
                "contrib": pc.divide(t["rank_scaled"], t["deg"]),
            }
        )

    from raycrawl.pipelines.dedup import coarse_key, coarse_parts

    cmask = coarse_parts(sf_dir) - 1

    def add_np(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(npart=coarse_key(df, ["dst"], cmask))

    def sum_damp(g: pd.DataFrame) -> pd.DataFrame:
        # per-node SUM has node-cardinality output: resolved inside
        # coarse dst partitions (pandas C groupby), never a native
        # aggregate; damping fused in (int64 floor on non-negatives)
        a = g.groupby("dst", sort=False)["contrib"].sum().reset_index()
        return pd.DataFrame(
            {
                "url": a["dst"],
                "rank_scaled": (
                    base + (85 * a["contrib"].astype("int64")) // 100
                ).astype("int64"),
            }
        )

    ranks = clean_blocks(
        nodes.map_batches(init_ranks, batch_format="pyarrow"), rank_schema
    ).materialize()
    zeros = clean_blocks(
        nodes.map_batches(zero_rows, batch_format="pyarrow"),
        pa.schema([("dst", pa.string()), ("contrib", pa.int64())]),
    ).materialize()
    for _ in range(iters):
        contribs = (
            edges_deg.join(ranks, join_type="inner", num_partitions=n_parts,
                           on=("src",), right_on=("url",))
            .map_batches(edge_contrib, batch_format="pyarrow")
        )
        ranks = clean_blocks(
            zeros.union(contribs)
            .map_batches(add_np, batch_format="pandas")
            .groupby("npart")
            .map_groups(sum_damp, batch_format="pandas"),
            rank_schema,
        ).materialize()

    return ranks


def crawl_host_matrix(sf_dir: str) -> rd.Dataset:
    """(src_host, dst_host, n_links): the domain-level link matrix over
    the distinct resolved link graph — the host-graph aggregation behind
    domain ranking and link-farm detection at web scale.

    Shares :func:`_link_edges` (distinct edges closed over corpus pages
    by a partitioned hash join, cross-host links kept). Hosts come from
    one RE2 kernel per side; per-batch PARTIAL counts run before the one
    (src_host, dst_host) shuffle, so the exchange is bounded by the
    host-pair domain per batch, never the edge count.
    """
    from ray.data.aggregate import Sum

    edges, _nodes, _n_parts = _link_edges(sf_dir)
    pat = r"^http://(?P<h>[^/]+)"

    def hosts_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "src_host": pc.struct_field(
                        pc.extract_regex(t["src"], pat), "h"
                    ),
                    "dst_host": pc.struct_field(
                        pc.extract_regex(t["dst"], pat), "h"
                    ),
                }
            )
            .group_by(["src_host", "dst_host"])
            .aggregate([("src_host", "count")])
        )
        return g.rename_columns(["src_host", "dst_host", "n"])

    return (
        edges.map_batches(hosts_partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("n", alias_name="n_links"))
    )


def crawl_hits(sf_dir: str, iters: int = 2, k: int = 20) -> rd.Dataset:
    """(url, auth_scaled, hub_scaled): top-k pages by HITS authority over
    the FULL resolved link graph (same shared edge set as pagerank /
    triangles), in pure int64 arithmetic so a DuckDB twin reproduces every
    bit.

    One iteration: hub_raw(u) = sum of auth over u's out-links, then
    max-normalize to hub = hub_raw * 10^6 // max(hub_raw); auth_raw(v) =
    sum of hub over v's in-links, max-normalized the same way (integer
    max-normalization replaces the usual L2 norm — deterministic, and the
    division is the SQL ``//``). ``iters`` is FIXED (the unrolled-CTE
    oracle mirrors each level), not run to convergence.

    Scale shape: the same iterated hash-join + grouped-sum skeleton as
    pagerank — per half-iteration one edges-to-scores join and one
    groupby-sum, both partitioned; the max is a scalar Dataset aggregate
    over in-plasma blocks; edges materialize ONCE (loop-invariant) and the
    driver holds only loop control."""
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import clean_blocks

    scale = 10**6
    edges, nodes, n_parts = _link_edges(sf_dir)
    edges = edges.materialize()
    vs = pa.schema([("url", pa.string()), ("v", pa.int64())])

    def const_rows(val: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {"url": t["url"],
                 "v": pa.array([val] * len(t), pa.int64())}
            )
        return f

    zeros = clean_blocks(
        nodes.map_batches(const_rows(0), batch_format="pyarrow"), vs
    ).materialize()
    auth = clean_blocks(
        nodes.map_batches(const_rows(scale), batch_format="pyarrow"), vs
    ).materialize()
    hub = zeros

    def half_step(scores: rd.Dataset, edge_key: str, out_key: str):
        """sum ``scores`` across edges grouped by ``out_key``'s endpoint,
        then integer max-normalize; returns a materialized (url, v)."""
        contrib = (
            edges.join(scores, join_type="inner", num_partitions=n_parts,
                       on=(edge_key,), right_on=("url",))
            .map_batches(
                lambda t, _ok=out_key: pa.table(
                    {"url": t[_ok], "v": t["v"]}
                ),
                batch_format="pyarrow",
            )
        )
        # per-node SUM output scales with the node count: coarse url
        # partitions + pandas C groupby, not a native aggregate
        from raycrawl.pipelines.dedup import coarse_key, coarse_parts

        cmask = coarse_parts(sf_dir) - 1

        def add_np(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(npart=coarse_key(df, ["url"], cmask))

        def sum_part(g: pd.DataFrame) -> pd.DataFrame:
            a = g.groupby("url", sort=False)["v"].sum().reset_index()
            a["v"] = a["v"].astype("int64")
            return a[["url", "v"]]

        summed = clean_blocks(
            zeros.union(contrib)
            .map_batches(add_np, batch_format="pandas")
            .groupby("npart")
            .map_groups(sum_part, batch_format="pandas"),
            vs,
        ).materialize()
        m = summed.max("v")
        if not m:
            return summed

        def norm(t: pa.Table) -> pa.Table:
            return pa.table(
                {"url": t["url"],
                 "v": pc.divide(pc.multiply(t["v"], scale), m)}
            )

        return clean_blocks(
            summed.map_batches(norm, batch_format="pyarrow"), vs
        ).materialize()

    for _ in range(iters):
        # hub from auth over OUT-links (join on dst, emit src), then auth
        # from hub over IN-links (join on src, emit dst)
        hub = half_step(auth, "dst", "src")
        auth = half_step(hub, "src", "dst")

    def ren(new: str):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(["url", new])
        return f

    return (
        auth.map_batches(ren("auth_scaled"), batch_format="pyarrow")
        .join(
            hub.map_batches(ren("hub_scaled"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=n_parts,
            on=("url",),
            right_on=("url",),
        )
        .sort(["auth_scaled", "url"], descending=[True, False])
        .limit(k)
    )


def crawl_dead_links(sf_dir: str) -> rd.Dataset:
    """(dst, n_refs): extracted link targets that are NOT corpus pages —
    the 404-candidate / frontier-expansion set every recrawl scheduler
    consumes (how many distinct pages reference each missing target).

    Shares :func:`_cand_edges` with the resolved-graph queries; the
    membership test is the same partitioned hash join flipped to Ray's
    native ``left_anti``, then one groupby counting distinct referrers
    (cand is already (src, dst)-distinct). Nothing is broadcast and the
    driver never sees the page set."""
    from ray.data.aggregate import Count

    cand, nodes, n_parts = _cand_edges(sf_dir)
    dead = cand.join(
        nodes.map_batches(
            lambda t: pa.table({"node": t["url"]}), batch_format="pyarrow"
        ),
        join_type="left_anti",
        num_partitions=n_parts,
        on=("dst",),
        right_on=("node",),
    )
    return dead.groupby("dst").aggregate(Count(alias_name="n_refs"))


def crawl_url_filter(
    sf_dir: str,
    blocked_domains: tuple = ("example.net", "h2.example.com"),
    blocked_path_re: str = r"/private/",
) -> rd.Dataset:
    """(dst_host, n_cands, n_domain_blocked, n_path_blocked, n_allowed):
    frontier URL filtering — the curation gate every production crawler
    runs on EXTRACTED candidates before they reach the frontier
    (C4/RefinedWeb-style URL blocklists): a candidate is rejected if its
    host is a blocked domain or any SUBDOMAIN of one (suffix semantics:
    ``example.net`` blocks every ``*.example.net``), or if its path
    matches a blocked pattern (tracking/private/infinite-calendar routes).

    Plan: the shared distinct candidate-edge set (:func:`_cand_edges` —
    same extraction contract as dead_links/pagerank), then a stateless
    vectorized classify pass: host via one RE2 ``extract_regex``, the
    domain rule as one ``equal`` + one ``ends_with`` kernel per blocklist
    entry, the path rule as one ``match_substring_regex``; per-batch
    partial counts reduce to one host-domain-bounded groupby. The
    blocklist rides into the closure (tiny); a REAL blocklist (100k+
    entries à la URLhaus) swaps the per-entry kernels for one reversed-
    host ``searchsorted`` probe against a broadcast sorted suffix array —
    same stage shape, still O(batch log B).
    """
    from ray.data.aggregate import Sum

    cand, _nodes, _n_parts = _cand_edges(sf_dir)
    suffixes = tuple("." + d for d in blocked_domains)

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("dst_host", pa.string()), ("n_cands", pa.int64()),
                 ("n_domain_blocked", pa.int64()),
                 ("n_path_blocked", pa.int64()),
                 ("n_allowed", pa.int64())]
            ).empty_table()
        host = pc.extract_regex(t["dst"], r"^https?://(?P<h>[^/]+)")
        host = pc.struct_field(host, "h")
        dom_bad = pa.array(np.zeros(t.num_rows, bool))
        for d, suf in zip(blocked_domains, suffixes):
            dom_bad = pc.or_(
                dom_bad, pc.or_(pc.equal(host, d), pc.ends_with(host, suf))
            )
        path = pc.replace_substring_regex(
            t["dst"], r"^https?://[^/]*", "")
        path_bad = pc.match_substring_regex(path, blocked_path_re)
        dom_np = dom_bad.to_numpy(zero_copy_only=False)
        path_np = path_bad.to_numpy(zero_copy_only=False)
        allowed = ~(dom_np | path_np)
        df = pd.DataFrame(
            {
                "dst_host": host.to_numpy(zero_copy_only=False),
                "n_cands": 1,
                "n_domain_blocked": dom_np.astype(np.int64),
                "n_path_blocked": path_np.astype(np.int64),
                "n_allowed": allowed.astype(np.int64),
            }
        )
        out = df.groupby("dst_host", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        cand.map_batches(classify, batch_format="pyarrow")
        .groupby("dst_host")
        .aggregate(
            Sum("n_cands", alias_name="n_cands"),
            Sum("n_domain_blocked", alias_name="n_domain_blocked"),
            Sum("n_path_blocked", alias_name="n_path_blocked"),
            Sum("n_allowed", alias_name="n_allowed"),
        )
    )


def crawl_frontier_priority(sf_dir: str, iters: int = 4,
                            k: int = 20) -> rd.Dataset:
    """(dst, priority_scaled, n_refs): frontier PRIORITIZATION — the
    uncrawled link targets (dead links) ranked by the summed PageRank of
    the pages that reference them. This is the classic crawl-scheduling
    policy (OPIC / PageRank-ordered frontier: Cho, Garcia-Molina & Page
    1998): expand the frontier where the authoritative mass points first.

    Composition of two shared plans, nothing new materializes twice:
    :func:`_cand_edges` (one extraction pass) feeds BOTH the left_anti
    dead-target join and, closed over pages, the PageRank iteration
    (:func:`_pagerank_ranks` over the same graph handle); referrer scores
    reach dead edges by ONE hash join on src, then a dst-partitioned
    grouped sum. All integer arithmetic — the oracle reuses the unrolled
    PageRank CTE with the final SELECT swapped for the dead-target join.
    """
    from ray.data.aggregate import Count, Sum

    from raycrawl.pipelines.dedup import clean_blocks

    cand, nodes, n_parts = _cand_edges(sf_dir)
    node_tbl = nodes.map_batches(
        lambda t: pa.table({"node": t["url"]}), batch_format="pyarrow"
    )
    # clean_blocks: the anti-join's empty partitions are schema-less and
    # racily poison the downstream score join (the Ray 2.49 empty-block
    # join edge)
    dead = clean_blocks(
        cand.join(
            node_tbl,
            join_type="left_anti",
            num_partitions=n_parts,
            on=("dst",),
            right_on=("node",),
        ),
        pa.schema([("src", pa.string()), ("dst", pa.string())]),
    )
    # resolved graph = the SAME cand closed over pages (shared handle —
    # the extraction pass, already distinct, feeds both consumers)
    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    edges = clean_blocks(
        cand.join(
            node_tbl,
            join_type="inner",
            num_partitions=n_parts,
            on=("dst",),
            right_on=("node",),
        ).select_columns(["src", "dst"]),
        edge_schema,
    )
    ranks = _pagerank_ranks(sf_dir, iters, graph=(edges, nodes, n_parts))
    scored = dead.join(
        ranks,
        join_type="inner",  # every referrer is a corpus page by construction
        num_partitions=n_parts,
        on=("src",),
        right_on=("url",),
    )
    return (
        scored.groupby("dst")
        .aggregate(
            Sum("rank_scaled", alias_name="priority_scaled"),
            Count(alias_name="n_refs"),
        )
        .sort(["priority_scaled", "dst"], descending=[True, False])
        .limit(k)
    )


def crawl_url_depth_hist(sf_dir: str) -> rd.Dataset:
    """(host, depth, n_urls): DISTINCT candidate-link URLs per host and
    path depth (depth = path segments = '/'-count minus the scheme's two)
    — the URL-space shape report a crawl operator reads before setting
    per-host depth budgets (deep dynamic trees vs flat sites).

    Plan: the shared distinct candidate-edge set (:func:`_cand_edges`)
    already carries one row per (referrer, url); each batch computes
    host + depth with two RE2/substring kernels and dedupes locally, then
    ONE groupby on (dst, host, depth) — distinct-by-dst since host and
    depth are functions of dst — collapses cross-referrer duplicates;
    the final (host, depth) count is partial-aggregated per batch and
    bounded by the host x depth domain."""
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import coarse_distinct, coarse_parts

    cand, _nodes, _n_parts = _cand_edges(sf_dir)
    pat = r"^http://(?P<h>[^/]+)"

    def keyed(t: pa.Table) -> pa.Table:
        host = pc.struct_field(pc.extract_regex(t["dst"], pat), "h")
        depth = pc.subtract(
            pc.cast(pc.count_substring(t["dst"], "/"), pa.int64()), 2
        )
        return (
            pa.table({"dst": t["dst"], "host": host, "depth": depth})
            .group_by(["dst", "host", "depth"])
            .aggregate([])
        )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["host", "depth"]).aggregate([("host", "count")])
        return g.rename_columns(["host", "depth", "n_urls"])

    # distinct-by-dst via the coarse partition (host/depth are functions
    # of dst); output cardinality = URL count, never a native aggregate
    urls = coarse_distinct(
        cand.map_batches(keyed, batch_format="pyarrow"),
        ["dst", "host", "depth"],
        coarse_parts(sf_dir) - 1,
    )
    return (
        urls.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "depth"])
        .aggregate(Sum("n_urls", alias_name="n_urls"))
    )


def star_disallow_prefixes(text: str) -> list[str]:
    """The ``*`` group's non-empty Disallow path prefixes from a
    robots.txt body, in file order (duplicates kept — the coverage OR is
    resolved downstream). Groups restart at every User-agent line; only
    groups whose agent is exactly ``*`` contribute (the audit convention;
    the full longest-match engine lives in state/robots.py)."""
    out, in_star = [], False
    for line in text.splitlines():
        ls = line.strip()
        low = ls.lower()
        if low.startswith("user-agent:"):
            in_star = ls.split(":", 1)[1].strip() == "*"
        elif in_star and low.startswith("disallow:"):
            p = ls.split(":", 1)[1].strip()
            if p:
                out.append(p)
    return out


def crawl_robots_coverage(sf_dir: str) -> rd.Dataset:
    """(host, n_blocked, n_allowed): how much of each host's candidate
    URL space its own robots.txt fences off — the pre-crawl coverage
    audit (how much of the frontier a polite crawler may fetch at all).

    Rules come from the corpus's own robots.txt rows: the ``*`` group's
    ``Disallow:`` path prefixes (the C4-style audit convention — the
    full longest-match Allow/Disallow engine lives in state/robots.py
    and governs the actual crawl; this operator reports raw Disallow
    coverage). Distinct candidate URLs come from the shared
    :func:`_cand_edges` plan.

    Scale shape: the rules table is O(hosts x rules-per-host) — tiny
    rows, never text; URLs meet rules by ONE hash join on the host
    (left_outer keeps robots-less hosts), the per-URL verdict is a
    vectorized prefix match, the multi-rule OR resolves in a
    (dst, host)-keyed groupby MAX, and the final host counts are
    partial-aggregated per batch."""
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import (
        clean_blocks,
        coarse_distinct,
        coarse_parts,
    )

    info = corpus_for(sf_dir)

    def rules_fn(t: pa.Table) -> pa.Table:
        hosts, pfxs = [], []
        for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            if not url.endswith("/robots.txt"):
                continue
            host = url.split("://", 1)[-1].split("/", 1)[0]
            for p in star_disallow_prefixes(text or ""):
                hosts.append(host)
                pfxs.append(p)
        return pa.table(
            {"r_host": pa.array(hosts, pa.string()),
             "pfx": pa.array(pfxs, pa.string())}
        )

    rules_schema = pa.schema([("r_host", pa.string()), ("pfx", pa.string())])
    rules = clean_blocks(
        rd.read_parquet(info["corpus"], columns=["url", "text"]).map_batches(
            rules_fn, batch_format="pyarrow"
        ),
        rules_schema,
    )

    cand, _nodes, n_parts = _cand_edges(sf_dir)
    pat = r"^http://(?P<h>[^/]+)"

    def keyed(t: pa.Table) -> pa.Table:
        host = pc.struct_field(pc.extract_regex(t["dst"], pat), "h")
        path = pc.replace_substring_regex(t["dst"], r"^http://[^/]+", "")
        return (
            pa.table({"dst": t["dst"], "host": host, "path": path})
            .group_by(["dst", "host", "path"])
            .aggregate([])
        )

    urls = clean_blocks(
        coarse_distinct(
            cand.map_batches(keyed, batch_format="pyarrow"),
            ["dst", "host", "path"],
            coarse_parts(sf_dir) - 1,
        ),
        pa.schema([("dst", pa.string()), ("host", pa.string()),
                   ("path", pa.string())]),
    )
    joined = urls.join(
        rules,
        join_type="left_outer",
        num_partitions=n_parts,
        on=("host",),
        right_on=("r_host",),
    )

    mask = coarse_parts(sf_dir) - 1

    def verdict(t: pa.Table) -> pa.Table:
        # starts_with takes a SCALAR pattern: run one vectorized kernel
        # per DISTINCT prefix in the batch (robots vocabularies are a
        # handful of paths — '/private', '/admin' — not per-URL strings)
        pfx_np = np.asarray(t["pfx"].to_numpy(zero_copy_only=False), object)
        blocked = np.zeros(t.num_rows, bool)
        for u in {x for x in pfx_np.tolist() if x}:
            sw = pc.starts_with(t["path"], pattern=u).to_numpy(
                zero_copy_only=False
            )
            blocked |= (pfx_np == u) & sw
        out = pd.DataFrame(
            {
                "dst": t["dst"].to_numpy(zero_copy_only=False),
                "host": t["host"].to_numpy(zero_copy_only=False),
                "blocked": blocked.astype(np.int64),
            }
        )
        from raycrawl.pipelines.dedup import coarse_key

        return out.assign(pp=coarse_key(out, ["dst"], mask))

    def host_partial(t: pa.Table) -> pa.Table:
        allowed = pc.subtract(pa.scalar(1, pa.int64()), t["blocked"])
        g = (
            pa.table(
                {"host": t["host"], "b": t["blocked"], "a": allowed}
            )
            .group_by("host")
            .aggregate([("b", "sum"), ("a", "sum")])
        )
        return g.rename_columns(["host", "n_blocked", "n_allowed"])

    def or_rules(g: pd.DataFrame) -> pd.DataFrame:
        # OR across a host's multiple rules — URL-cardinality output, so
        # resolved inside coarse dst partitions, never a native aggregate
        a = (
            g.groupby(["dst", "host"], sort=False)["blocked"]
            .max()
            .reset_index()
        )
        a["blocked"] = a["blocked"].astype("int64")
        return a[["dst", "host", "blocked"]]

    return (
        joined.map_batches(verdict, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(or_rules, batch_format="pandas")
        .map_batches(host_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_blocked", alias_name="n_blocked"),
            Sum("n_allowed", alias_name="n_allowed"),
        )
    )


def crawl_host_rank(sf_dir: str, iters: int = 4, k: int = 10) -> rd.Dataset:
    """(host, rank_scaled): top-k DOMAINS by integer PageRank over the
    host-level projection of the CANDIDATE link graph (distinct host
    pairs over every extracted link, intra-host self-loops dropped;
    unfetched target hosts are nodes too) — domain authority the way a
    crawl scheduler ranks it: over what the crawl has SEEN, fetched or
    not (the resolved page graph here has zero cross-host edges — every
    cross-host link points at an unfetched host, so projecting the
    resolved graph would rank nothing).

    Reuses :func:`_pagerank_ranks` wholesale: only the graph handle
    changes — host edges are the per-batch host projection of the shared
    distinct candidate edges with a local dedup, one (src, dst) shuffle
    making them globally distinct; host nodes are the melted distinct
    hosts of BOTH edge ends. The oracle runs the SAME unrolled integer
    iteration over the host-projected CTEs
    (``_pagerank_sql(host_graph=True)``)."""
    from raycrawl.pipelines.dedup import (
        clean_blocks,
        coarse_distinct,
        coarse_parts,
    )

    cand, _nodes, n_parts = _cand_edges(sf_dir)
    pat = r"^http://(?P<h>[^/]+)"
    mask = coarse_parts(sf_dir) - 1

    def hostify_edges(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "src": pc.struct_field(pc.extract_regex(t["src"], pat), "h"),
                "dst": pc.struct_field(pc.extract_regex(t["dst"], pat), "h"),
            }
        )
        g = g.filter(pc.invert(pc.equal(g["src"], g["dst"])))
        return g.group_by(["src", "dst"]).aggregate([])

    edge_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    host_edges = clean_blocks(
        coarse_distinct(
            cand.map_batches(hostify_edges, batch_format="pyarrow"),
            ["src", "dst"],
            mask,
        ),
        edge_schema,
    )

    def melt_hosts(t: pa.Table) -> pa.Table:
        s = pc.struct_field(pc.extract_regex(t["src"], pat), "h")
        d = pc.struct_field(pc.extract_regex(t["dst"], pat), "h")
        h = pa.concat_tables([pa.table({"url": s}), pa.table({"url": d})])
        return h.group_by("url").aggregate([])

    node_schema = pa.schema([("url", pa.string())])
    host_nodes = clean_blocks(
        coarse_distinct(
            cand.map_batches(melt_hosts, batch_format="pyarrow"),
            ["url"],
            mask,
        ),
        node_schema,
    )
    ranks = _pagerank_ranks(
        sf_dir, iters, graph=(host_edges, host_nodes, n_parts)
    )
    return (
        ranks.map_batches(
            lambda t: t.rename_columns(["host", "rank_scaled"]),
            batch_format="pyarrow",
        )
        .sort(["rank_scaled", "host"], descending=[True, False])
        .limit(k)
    )


def crawl_budget_alloc(sf_dir: str, budget: int = 1000) -> rd.Dataset:
    """(host, n_urls, alloc): split a fixed next-wave fetch budget across
    hosts PROPORTIONALLY to their uncrawled-candidate demand, by the
    largest-remainder (Hamilton) method — sum(alloc) == budget exactly,
    every quantity an integer, deterministic under ties (remainder DESC,
    host ASC). This is the scheduling step between frontier scoring and
    the politeness release: a crawl operator's per-host slot table.

    Scale shape: demand = DISTINCT dead candidate urls per host (the
    shared :func:`_cand_edges` plan anti-joined over pages, dst dedup in
    coarse partitions, host counts via per-batch partials). The
    allocator itself needs two scalar aggregates (total demand, total
    floor-quota) and ONE bounded driver collect: the top-R remainder
    hosts, R = budget - sum(quota) < min(#hosts, budget) — bounded by a
    query PARAMETER, never the corpus. No cap at a host's own demand:
    when budget > total demand every host is over-allocated pro rata
    (callers cap at fetch time); the method is exact either way.
    """
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import (clean_blocks, coarse_distinct,
                                          coarse_parts)

    cand, nodes, n_parts = _cand_edges(sf_dir)
    dead = clean_blocks(
        cand.join(
            nodes.map_batches(
                lambda t: pa.table({"node": t["url"]}),
                batch_format="pyarrow",
            ),
            join_type="left_anti",
            num_partitions=n_parts,
            on=("dst",),
            right_on=("node",),
        ),
        pa.schema([("src", pa.string()), ("dst", pa.string())]),
    )
    mask = coarse_parts(sf_dir) - 1
    urls = coarse_distinct(
        dead.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], t["dst"]))
            .select(["dst"]),
            batch_format="pyarrow",
        ),
        ["dst"], mask,
    )

    def host_partial(t: pa.Table) -> pa.Table:
        h = pc.fill_null(
            pc.struct_field(
                pc.extract_regex(t["dst"], r"^http://(?P<host>[^/]+)"),
                "host",
            ),
            "",
        )
        g = (
            pa.table({"host": h, "n": pa.array(np.ones(len(t), np.int64))})
            .group_by("host")
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["host", "n"])

    hosts = (
        urls.map_batches(host_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n", alias_name="n_urls"))
    ).materialize()  # reused by three consumers below
    total = hosts.sum("n_urls")
    if not total:
        return rd.from_arrow(pa.table(
            {"host": pa.array([], pa.string()),
             "n_urls": pa.array([], pa.int64()),
             "alloc": pa.array([], pa.int64())}
        ))

    def quotas(t: pa.Table) -> pa.Table:
        scaled = pc.multiply(t["n_urls"], budget)
        return pa.table(
            {
                "host": t["host"],
                "n_urls": t["n_urls"],
                # all quantities non-negative: // and % agree across
                # numpy / Arrow / DuckDB (no floor-vs-truncate split)
                "quota": pc.divide(scaled, total),
                "rem": pc.subtract(
                    scaled, pc.multiply(pc.divide(scaled, total), total)
                ),
            }
        )

    qt = hosts.map_batches(quotas, batch_format="pyarrow").materialize()
    leftover = budget - qt.sum("quota")
    bonus = set()
    if leftover > 0:
        top = (
            qt.sort(["rem", "host"], descending=[True, False])
            .limit(int(leftover))
            .take_all()
        )  # bounded by the budget parameter
        bonus = {r["host"] for r in top}
    import ray as _ray

    bset = _ray.put(bonus)  # budget-bounded broadcast set

    def finish(t: pa.Table) -> pa.Table:
        bs = _ray.get(bset)
        extra = pa.array(
            [1 if h in bs else 0 for h in t["host"].to_pylist()],
            pa.int64(),
        )
        return pa.table(
            {
                "host": t["host"],
                "n_urls": t["n_urls"],
                "alloc": pc.add(t["quota"], extra),
            }
        )

    return qt.map_batches(finish, batch_format="pyarrow")


def crawl_url_templates(sf_dir: str, k: int = 20) -> rd.Dataset:
    """(template, n_urls): top-k URL path templates over the DISTINCT
    candidate-link set, template = url with every digit run collapsed to
    'N' — the crawler-trap / infinite-space detector (a calendar or
    session-id trap shows up as one template with a colossal distinct-URL
    count long before the frontier drowns).

    Scale shape: one vectorized RE2 replace per batch over the shared
    distinct candidate plan, per-batch partial counts, then the standard
    coarse-hash grouped sum (template cardinality scales with the corpus)
    and a distributed top-k sort/limit."""
    from raycrawl.pipelines.dedup import (coarse_distinct, coarse_parts,
                                          coarse_sum)

    cand, _nodes, _n_parts = _cand_edges(sf_dir)
    mask = coarse_parts(sf_dir) - 1
    urls = coarse_distinct(
        cand.map_batches(
            lambda t: t.select(["dst"]), batch_format="pyarrow"
        ),
        ["dst"], mask,
    )

    def templ_partial(t: pa.Table) -> pa.Table:
        tpl = pc.replace_substring_regex(t["dst"], r"[0-9]+", "N")
        g = (
            pa.table({"template": tpl})
            .group_by("template")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["template", "n_urls"])

    return (
        coarse_sum(
            urls.map_batches(templ_partial, batch_format="pyarrow"),
            ["template"], ["n_urls"], mask,
        )
        .sort(["n_urls", "template"], descending=[True, False])
        .limit(k)
    )


def crawl_recrawl_priority(sf_dir: str, k: int = 20) -> rd.Dataset:
    """(url, age_s, indeg, priority): top-k pages by RE-CRAWL priority —
    the freshness scheduling step of an incremental crawler (Cho &
    Garcia-Molina / Olston & Najork): stale AND well-linked pages
    re-fetch first. priority = age_seconds x (1 + indegree), exact
    integers; "now" is the corpus's own max warc_ts (deterministic — a
    live crawler passes the wall clock).

    Scale shape: "now" is ONE scalar aggregate over the pruned (url,
    warc_ts) read; indegree is the standard coarse-partition grouped sum
    over the resolved edge set; pages meet their indegree in ONE
    left_outer hash join (absent = 0); the top-k sort moves one small
    row per page."""
    from raycrawl.pipelines.dedup import (clean_blocks, coarse_parts,
                                          coarse_sum)

    edges, nodes, n_parts = _link_edges(sf_dir)
    info = corpus_for(sf_dir)
    mask = coarse_parts(sf_dir) - 1

    pages = rd.read_parquet(
        info["corpus"], columns=["url", "warc_ts"]
    ).map_batches(
        lambda t: pa.table(
            {"url": t["url"], "us": pc.cast(t["warc_ts"], pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()  # read once: scalar max + the join below
    max_us = int(pages.max("us"))

    indeg = clean_blocks(
        coarse_sum(
            edges.map_batches(
                lambda t: pa.table(
                    {
                        "url": t["dst"],
                        "ind": pa.array(
                            np.ones(t.num_rows, np.int64), pa.int64()
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["url"], ["ind"], mask,
        ),
        pa.schema([("url", pa.string()), ("ind", pa.int64())]),
    )

    def score(t: pa.Table) -> pa.Table:
        ind = pc.coalesce(t["ind"], pa.scalar(0, pa.int64()))
        age = pc.divide(
            pc.subtract(pa.scalar(max_us, pa.int64()), t["us"]),
            pa.scalar(1_000_000, pa.int64()),
        )
        return pa.table(
            {
                "url": t["url"],
                "age_s": age,
                "indeg": ind,
                "priority": pc.multiply(
                    age, pc.add(ind, pa.scalar(1, pa.int64()))
                ),
            }
        )

    out = clean_blocks(
        pages.join(indeg, join_type="left_outer", num_partitions=n_parts,
                   on=("url",), right_on=("url",)),
        pa.schema([("url", pa.string()), ("us", pa.int64()),
                   ("ind", pa.int64())]),
    ).map_batches(score, batch_format="pyarrow")
    return out.sort(["priority", "url"], descending=[True, False]).limit(k)


def crawl_outlink_spam(sf_dir: str) -> rd.Dataset:
    """(url, n_links, n_external, ext_ratio_4096): per-page external-link
    ratio over the DISTINCT candidate-link set (integer 4096ths) — the
    classic link-spam / link-farm page signal (a page whose links mostly
    leave its host). External = dst host differs from src host; dead and
    unfetched targets count (the signal is about where a page POINTS,
    not what resolved).

    Scale shape: one RE2 host kernel per side + per-batch partials, then
    the standard coarse-partition grouped sum (per-PAGE output scales
    with the corpus — never a native aggregate); the ratio is one
    vectorized integer pass."""
    from raycrawl.pipelines.dedup import (clean_blocks, coarse_parts,
                                          coarse_sum)

    cand, nodes, n_parts = _cand_edges(sf_dir)
    mask = coarse_parts(sf_dir) - 1

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("url", pa.string()), ("n", pa.int64()),
                 ("n_ext", pa.int64())]
            ).empty_table()
        host = r"^https?://(?P<host>[^/]+)"
        sh = pc.fill_null(
            pc.struct_field(pc.extract_regex(t["src"], host), "host"), ""
        )
        dh = pc.fill_null(
            pc.struct_field(pc.extract_regex(t["dst"], host), "host"), ""
        )
        ext = pc.cast(pc.not_equal(sh, dh), pa.int64())
        g = (
            pa.table(
                {
                    "url": t["src"],
                    "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                    "n_ext": ext,
                }
            )
            .group_by("url")
            .aggregate([("n", "sum"), ("n_ext", "sum")])
        )
        return g.rename_columns(["url", "n", "n_ext"])

    def ratio(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "n_links": t["n"],
                "n_external": t["n_ext"],
                "ext_ratio_4096": pc.divide(
                    pc.multiply(t["n_ext"], pa.scalar(4096, pa.int64())),
                    t["n"],
                ),
            }
        )

    return clean_blocks(
        coarse_sum(
            cand.map_batches(partial, batch_format="pyarrow"),
            ["url"], ["n", "n_ext"], mask,
        ),
        pa.schema([("url", pa.string()), ("n", pa.int64()),
                   ("n_ext", pa.int64())]),
    ).map_batches(ratio, batch_format="pyarrow")
