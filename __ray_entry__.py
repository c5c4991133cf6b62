"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship BFS crawl at sf0.001 scale; ``queries()``
exposes one callable per implemented operator family (SURVEY.md §2 plus the
training-data operators); ``oracle_sql()`` gives DuckDB twins for every
SQL-expressible query — column names and integer-only aggregates are
mirrored exactly (money sums in cents; see raycrawl/pipelines/relops.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the raycrawl library) calls ray.init()/ray.shutdown().

The crawl-family queries run over the deterministic synthetic
Common-Crawl-style corpus (BASELINE.json input_hint schema) cached under
/tmp/raycrawl_corpus/<sf>; their oracles read the SAME parquet files by
literal path, so both sides see identical bytes. The corpus for sf0.01 (the
driver's correctness scale) is materialized at import time so the oracle
can run regardless of execution order.
"""

from __future__ import annotations

import inspect
import os
import sys
from collections.abc import Callable
from typing import Any

# robust against drivers importing this module by file path from another cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from raycrawl.pipelines import (
    analytics,
    ann,
    dedup,
    multimodal,
    relops,
    retrieval,
    textops,
    tpch,
)
from raycrawl.pipelines.crawlqueries import (
    corpus_for,
    crawl_bfs,
    crawl_bfs_with_query,
    crawl_budget_alloc,
    crawl_degree_hist,
    crawl_outlink_spam,
    crawl_recrawl_priority,
    crawl_url_templates,
    crawl_edges,
    crawl_edges_joined,
    crawl_dead_links,
    crawl_filter_by,
    crawl_hits,
    crawl_host_matrix,
    crawl_host_stats,
    crawl_pagerank,
    crawl_components,
    crawl_frontier_priority,
    crawl_host_rank,
    crawl_robots_coverage,
    crawl_text_identity,
    crawl_url_depth_hist,
    crawl_triangles,
    crawl_url_filter,
)

# materialize the correctness-scale corpus for the oracle's literal path
corpus_for("/root/testdata/sf0.01")

_SF001_CORPUS = "/tmp/raycrawl_corpus/sf0.01/corpus/*/*.parquet"

_HTML_FILTER = (
    "url NOT LIKE '%/robots.txt' AND url NOT LIKE '%.pdf' "
    "AND url NOT LIKE '%.png' AND url NOT LIKE '%.css'"
)

# the linkflow composition (extract -> trim -> join -> same-authority
# filter) over the golden text lines — shared by the crawl_edges_joined
# oracle and the degree-distribution oracle built on top of it
_EDGES_JOINED_SQL = f"""
SELECT DISTINCT url AS src_url,
       CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
            ELSE 'http://' || host || h1 END AS cand_norm
FROM (
  SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
         split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                    '?', 1) AS h1
  FROM read_parquet('{_SF001_CORPUS}')
  WHERE {_HTML_FILTER} AND text <> ''
)
WHERE (CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
            ELSE 'http://' || host || h1 END)
      LIKE 'http://' || host || '/%'
"""


def _pagerank_sql(iters: int = 4, k: int = 20, final: str | None = None,
                  host_graph: bool = False) -> str:
    """Unrolled exact-integer PageRank oracle (crawl_pagerank twin).

    The iteration count is FIXED, so the oracle is ``iters`` chained CTE
    levels instead of a recursive CTE (standard SQL forbids aggregates
    over the recursive reference). All arithmetic is BIGINT floor
    division — bit-identical to the pipeline's int64 pyarrow kernels.
    ``final`` swaps the closing SELECT (it may reference ``r{iters}`` and
    every graph CTE) — the frontier-priority twin reuses the whole
    iteration this way. ``host_graph`` swaps the node/edge CTEs for the
    domain-level projection (distinct host pairs, self-loops dropped) —
    the crawl_host_rank twin runs the SAME iteration over that graph."""
    scale, base = 10**12, 15 * 10**12 // 100
    step = """
r{i} AS (
  SELECT p.url, {base} + (85 * COALESCE(SUM(c.contrib), 0)) // 100 AS r
  FROM pages p LEFT JOIN (
    SELECT e.dst, r{j}.r // deg.d AS contrib
    FROM edges e
    JOIN r{j} ON e.src = r{j}.url
    JOIN deg ON deg.src = e.src
  ) c ON c.dst = p.url
  GROUP BY p.url
)"""
    levels = ",".join(
        step.format(i=i, j=i - 1, base=base) for i in range(1, iters + 1)
    )
    h = "regexp_extract({0}, '^http://([^/]+)', 1)"
    if host_graph:
        # the CANDIDATE host graph: every extracted link's host pair,
        # unfetched hosts included as nodes (the resolved page graph has
        # no cross-host edges — see crawl_host_rank's docstring)
        graph_block = f"""
pages AS (
  SELECT DISTINCT h AS url FROM (
    SELECT {h.format('src')} AS h FROM cand
    UNION ALL SELECT {h.format('dst')} AS h FROM cand)
),
edges AS (
  SELECT DISTINCT {h.format('src')} AS src, {h.format('dst')} AS dst
  FROM cand
  WHERE {h.format('src')} <> {h.format('dst')}
)"""
    else:
        graph_block = """
pages AS (
  SELECT url FROM pageset
),
edges AS (
  SELECT src, dst FROM cand
  WHERE dst IN (SELECT url FROM pages) AND src <> dst
)"""
    return f"""
WITH pageset AS (
  SELECT url FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
{graph_block},
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
r0 AS (SELECT url, CAST({scale} AS BIGINT) AS r FROM pages),
{levels}
{final or f'''SELECT url, CAST(r AS BIGINT) AS rank_scaled FROM r{iters}
ORDER BY rank_scaled DESC, url LIMIT {k}'''}
"""


def _frontier_priority_sql(iters: int = 4, k: int = 20) -> str:
    """crawl_frontier_priority twin: the full PageRank iteration, closed
    with a dead-target (NOT IN pages) join summing referrer ranks."""
    final = f"""
, dead AS (
  SELECT src, dst FROM cand
  WHERE dst NOT IN (SELECT url FROM pages) AND src <> dst
)
SELECT d.dst, CAST(SUM(r.r) AS BIGINT) AS priority_scaled,
       CAST(COUNT(*) AS BIGINT) AS n_refs
FROM dead d JOIN r{iters} r ON d.src = r.url
GROUP BY d.dst
ORDER BY priority_scaled DESC, dst LIMIT {k}"""
    return _pagerank_sql(iters=iters, final=final)


def _hits_sql(iters: int = 2, k: int = 20) -> str:
    """Unrolled exact-integer HITS oracle (crawl_hits twin).

    Each Ray half-iteration (grouped sum over one edge direction, then
    integer max-normalization) is one pair of CTE levels; BIGINT floor
    division matches the pipeline's int64 pyarrow kernels bit for bit."""
    scale = 10**6
    half = """
{out}r AS (
  SELECT p.url, COALESCE(SUM(x.v), 0) AS v
  FROM pages p LEFT JOIN (
    SELECT e.{okey} AS u, s.v FROM edges e JOIN {src} s ON e.{jkey} = s.url
  ) x ON x.u = p.url
  GROUP BY p.url
),
{out} AS (
  SELECT url, v * {scale} // (SELECT MAX(v) FROM {out}r) AS v FROM {out}r
)"""
    levels, prev_auth = [], "a0"
    for i in range(1, iters + 1):
        levels.append(half.format(out=f"h{i}", okey="src", jkey="dst",
                                  src=prev_auth, scale=scale))
        levels.append(half.format(out=f"a{i}", okey="dst", jkey="src",
                                  src=f"h{i}", scale=scale))
        prev_auth = f"a{i}"
    return f"""
WITH pages AS (
  SELECT url FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
edges AS (
  SELECT src, dst FROM cand
  WHERE dst IN (SELECT url FROM pages) AND src <> dst
),
a0 AS (SELECT url, CAST({scale} AS BIGINT) AS v FROM pages),
{",".join(levels)}
SELECT a.url, CAST(a.v AS BIGINT) AS auth_scaled,
       CAST(h.v AS BIGINT) AS hub_scaled
FROM a{iters} a JOIN h{iters} h ON a.url = h.url
ORDER BY auth_scaled DESC, a.url LIMIT {k}
"""


def entry() -> Any:
    """Flagship pipeline: full BFS crawl of the sf0.001-scale corpus."""
    return crawl_bfs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # ---- crawl family (SURVEY §2.1-2.5) ----
        "crawl_bfs": crawl_bfs,
        "crawl_bfs_with_query": crawl_bfs_with_query,
        "crawl_edges": crawl_edges,
        "crawl_edges_joined": crawl_edges_joined,
        "crawl_degree_hist": crawl_degree_hist,
        "crawl_text_identity": crawl_text_identity,
        "crawl_host_stats": crawl_host_stats,
        "crawl_filter_by": crawl_filter_by,
        "crawl_pagerank": crawl_pagerank,
        "crawl_host_matrix": crawl_host_matrix,
        "crawl_triangles": crawl_triangles,
        "crawl_components": crawl_components,
        # ---- text analysis ----
        "docs_token_stats": textops.token_stats,
        "docs_quality": textops.quality_stats,
        "docs_quality_label": textops.quality_label,
        "docs_clean_text": textops.clean_text,
        "docs_lang_counts": textops.lang_counts,
        "docs_langid": textops.langid,
        "docs_fingerprints": textops.fingerprints,
        "docs_vocab_topk": textops.vocab_topk,
        # ---- dedup ----
        "docs_exact_dedup": dedup.exact_dedup,
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_simhash": dedup.simhash_pairs,
        "dedup_embedding_cosine": lambda sf: dedup.embedding_near_dup(sf, threshold=0.3),
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_survivors": dedup.dedup_survivors,
        # ---- similarity search ----
        "ann_brute_topk": ann.brute_force_topk,
        "ann_lsh_topk": _ann_lsh_checked,
        "ann_ivf_topk": _ann_ivf_checked,
        "ann_ivf_index_stats": ann.ivf_index_stats,
        # ---- multimodal plumbing ----
        "multimodal_meta": _multimodal_meta,
        "multimodal_decode": multimodal.decode_features_flat,
        "multimodal_frame_sample": multimodal.frame_sample,
        "multimodal_dims": multimodal.multimodal_dims,
        # ---- relational breadth (groupby/join/sort/window/sessionize) ----
        "q1_returnflag_agg": relops.q1_returnflag_agg,
        "mktsegment_revenue": relops.mktsegment_revenue,
        "orders_lineitem_join": relops.orders_lineitem_join,
        "urgent_order_revenue": relops.urgent_order_revenue,
        "lineitem_topk": relops.lineitem_topk,
        "events_window_agg": relops.events_window_agg,
        "events_sliding_agg": relops.events_sliding_agg,
        "events_sessionize": relops.events_sessionize,
        "events_topk_users": relops.events_topk_users,
        "events_asof_join": relops.events_asof_join,
        "events_range_join": relops.events_range_join,
        # skew-safe (user, ts-slice)-salted twins: identical output rows,
        # built for a hot key owning most of the table
        "events_asof_join_salted": lambda sf: relops.events_asof_join(
            sf, salt_slices=8
        ),
        "events_range_join_salted": lambda sf: relops.events_range_join(
            sf, salt_slices=8
        ),
        "events_distinct_users": relops.events_distinct_users,
        "events_hll_users": _hll_checked,
        "docs_bpe_token_counts": textops.bpe_token_counts,
        "docs_stopword_stats": textops.stopword_stats,
        "docs_repetition_stats": textops.repetition_stats,
        "docs_decontaminate": textops.decontaminate,
        "docs_hash_split": textops.hash_split,
        "docs_curation": textops.curation,
        "brand_revenue": relops.brand_revenue,
        "supplier_nation_balance": relops.supplier_nation_balance,
        "region_nation_counts": relops.region_nation_counts,
        "orders_price_quantiles": relops.orders_price_quantiles,
        "docs_top_per_lang": textops.top_docs_per_lang,
        "docs_bigrams_topk": textops.bigrams_topk,
        "docs_heavy_tokens": textops.heavy_tokens,
        "docs_stratified_sample": textops.stratified_sample,
        # ---- window / rollup / semi-anti join / pivot ----
        "events_user_running": analytics.events_user_running,
        "lineitem_rollup": analytics.lineitem_rollup,
        "lineitem_cube": analytics.lineitem_cube,
        "customers_without_big_orders": analytics.customers_without_big_orders,
        "customers_with_big_orders": analytics.customers_with_big_orders,
        "events_pivot": analytics.events_pivot,
        "small_quantity_revenue": analytics.small_quantity_revenue,
        "events_funnel": analytics.events_funnel,
        "events_user_paths": analytics.events_user_paths,
        "events_outliers": analytics.events_outliers,
        "events_close_pairs": analytics.events_close_pairs,
        "events_cohort_retention": analytics.events_cohort_retention,
        "nation_customer_supplier_outer": analytics.nation_customer_supplier_outer,
        # ---- retrieval / cross-doc duplication ----
        "docs_tfidf_topk": retrieval.docs_tfidf_topk,
        "docs_bm25_topk": retrieval.docs_bm25_topk,
        "docs_dup_ngrams": retrieval.docs_dup_ngrams,
        "docs_postings": retrieval.docs_postings,
        # ---- vector aggregates ----
        "embeddings_label_centroids": ann.label_centroids,
        "embeddings_kmeans": ann.kmeans_assign,
        # ---- round 4: span dedup, corpus-relative signals, Q13/Q18 ----
        "docs_segment_dedup": textops.segment_dedup,
        "docs_common_token_ratio": textops.common_token_ratio,
        "docs_length_pctile": textops.length_pctile,
        "orders_count_distribution": analytics.orders_count_distribution,
        "top_customer_orders": analytics.top_customer_orders,
        # ---- round 4: HITS, collocations, CDC compaction, incremental
        # dedup ----
        "crawl_hits": crawl_hits,
        "docs_cooccur_topk": textops.cooccur_topk,
        "docs_pmi_topk": textops.pmi_topk,
        "events_latest_state": analytics.events_latest_state,
        "docs_incremental_dedup": dedup.incremental_dedup,
        "orders_merge_upsert": analytics.orders_merge_upsert,
        "dedup_containment": dedup.containment_pairs,
        "crawl_dead_links": crawl_dead_links,
        "docs_bpe_train": textops.bpe_train,
        "docs_feature_hash": textops.feature_hash,
        # ---- round 4: semi-structured extraction + sufficient-stats OLS
        "events_json_extract": analytics.events_json_extract,
        "docs_linreg": analytics.docs_linreg,
        "events_quantile_sketch": _quantile_sketch_checked,
        "docs_decontaminate_bloom": _decontaminate_bloom_checked,
        # ---- round 4: blocklist scrub, sequence packing, OOV rate ----
        "docs_scrub": textops.scrub,
        "docs_pack_manifest": textops.pack_manifest,
        "docs_oov_rate": textops.oov_rate,
        # ---- round 4: DSIR weights, bigram fluency, shuffle shards ----
        "docs_dsir_weights": textops.dsir_weights,
        "docs_fluency": textops.fluency,
        "docs_shuffle_shards": textops.shuffle_shards,
        "docs_boilerplate_strip": textops.boilerplate_strip,
        "docs_prepare": textops.prepare,
        "events_watermark_late": analytics.events_watermark_late,
        # ---- round 4: PII redaction, source mixing, Q21/Q22 shapes,
        # count-min sketch ----
        "docs_pii_scrub": textops.pii_scrub,
        "docs_mix_upsample": textops.mix_upsample,
        "customers_above_avg_inactive": analytics.customers_above_avg_inactive,
        "suppliers_sole_returns": analytics.suppliers_sole_returns,
        "events_cms_counts": _cms_checked,
        # docs_bpe_encode self-checks exactly at query time (reference
        # trainer+encoder over the vocab-bounded word table), like
        # docs_bpe_train — iterative greedy rewriting isn't SQL
        "docs_bpe_encode": textops.bpe_encode,
        "multimodal_wav_meta": multimodal.multimodal_wav_meta,
        # ---- round 4: Q14/Q15/Q2 shapes, per-group mode, rolling
        # distinct users, bottom-k hash sample ----
        "supplier_top_revenue": analytics.supplier_top_revenue,
        "promo_revenue_share": analytics.promo_revenue_share,
        "part_cheapest_supplier": analytics.part_cheapest_supplier,
        "events_mode_type": analytics.events_mode_type,
        "events_wau": analytics.events_wau,
        "docs_hash_sample": textops.hash_sample,
        # ---- round 4: SemDeDup, frontier URL blocklist, phrase search,
        # Q19 disjunctive-band join ----
        "embeddings_semdedup": dedup.semdedup,
        "crawl_url_filter": crawl_url_filter,
        "docs_phrase_search": retrieval.docs_phrase_search,
        "q19_banded_revenue": relops.q19_disjunctive_revenue,
        "crawl_frontier_priority": crawl_frontier_priority,
        "multimodal_resize": multimodal.multimodal_resize,
        "docs_code_score": textops.code_score,
        # ---- round 4: TPC-H multi-dim snowflake join batch ----
        "q5_local_supplier_volume": tpch.q5_local_supplier_volume,
        "q7_nation_trade_volume": tpch.q7_nation_trade_volume,
        "q8_market_share": tpch.q8_market_share,
        "q9_product_profit": tpch.q9_product_profit,
        "q10_returned_revenue": tpch.q10_returned_revenue,
        "q4_late_ship_priority": tpch.q4_late_ship_priority,
        "q16_supplier_variety": tpch.q16_supplier_variety,
        "q20_dominant_suppliers": tpch.q20_dominant_suppliers,
        # ---- round 4: webtext analytics batch ----
        "crawl_url_depth_hist": crawl_url_depth_hist,
        "docs_ttr": textops.ttr,
        "docs_readability": textops.readability,
        "crawl_robots_coverage": crawl_robots_coverage,
        "crawl_host_rank": crawl_host_rank,
        "multimodal_ahash": multimodal.multimodal_ahash,
        "events_gap_hist": relops.events_gap_hist,
        "embeddings_top_direction": ann.power_iteration,
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q3_shipping_priority": tpch.q3_shipping_priority,
        "q11_important_stock": tpch.q11_important_stock,
        "orders_price_median": relops.orders_price_median,
        "orders_price_p90": relops.orders_price_p90,
        "docs_langid_confusion": textops.langid_confusion,
        "docs_chunks": textops.doc_chunks,
        "crawl_recrawl_priority": crawl_recrawl_priority,
        "crawl_outlink_spam": crawl_outlink_spam,
        # ---- round 4: profiling / grouped-sketch / fuzzy-linkage batch ----
        "docs_profile": analytics.table_profile,
        "events_hll_by_type": _hll_by_type_checked,
        "customers_edit1_pairs": dedup.edit1_pairs,
        "dedup_source_stats": dedup.dedup_source_stats,
        "ann_quantized_topk": ann.quantized_topk,
        "crawl_budget_alloc": crawl_budget_alloc,
        "docs_vocab_growth": textops.vocab_growth,
        "docs_lang_source_drift": textops.lang_source_drift,
        "crawl_url_templates": crawl_url_templates,
        "events_weekly_trend": analytics.events_weekly_trend,
        "events_conversion_lag": analytics.events_conversion_lag,
        "events_user_value_deciles": analytics.events_user_value_deciles,
    }


def _multimodal_meta(sf_dir: str):
    """SQL-comparable projection of the multimodal decode stage."""
    ds = multimodal.decode_features(sf_dir)
    return ds.select_columns(["doc_id", "n_bytes", "first_byte"])


def _ann_recall(approx, exact) -> float:
    e = {(q, v) for q, v in zip(exact["query_id"].to_pylist(),
                                exact["vec_id"].to_pylist())}
    a = {(q, v) for q, v in zip(approx["query_id"].to_pylist(),
                                approx["vec_id"].to_pylist())}
    return len(e & a) / max(len(e), 1)


def _hll_checked(sf_dir: str):
    """HyperLogLog user cardinality with a CHECKED error bound vs the exact
    two-level distinct count — deterministic hash, no SQL oracle (DuckDB's
    approx_count_distinct is a different sketch), so the correctness signal
    is this assertion failing loudly inside the driver's rows-only check."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    approx = relops.events_hll_users(sf_dir)
    # the exact twin, computed locally (this is the CHECK, not the
    # operator — the distributed exact path is events_distinct_users)
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    exact = len(pc.unique(t["user_id"]))
    got = approx["n_users_hll"][0].as_py()
    err = abs(got - exact) / max(exact, 1)
    # m=2^14 registers -> sigma ~0.8%; 4% is ~5 sigma and still catches a
    # broken register/merge path instantly
    assert err <= 0.04, f"HLL {got} vs exact {exact}: error {err:.3f} > 0.04"
    return approx


def _hll_by_type_checked(sf_dir: str):
    """Per-group HyperLogLog distinct users with every group's error bound
    CHECKED vs the exact per-type distinct count — same no-SQL-oracle
    reasoning as :func:`_hll_checked`; the assertion failing loudly inside
    the driver's rows-only check IS the correctness signal."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    approx = relops.events_hll_by_type(sf_dir)
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )
    exact = {
        r["event_type"]: r["user_id_distinct"]
        for r in t.group_by("event_type")
        .aggregate([("user_id", "count_distinct")])
        .rename_columns(["event_type", "user_id_distinct"])
        .to_pylist()
    }
    assert set(approx["event_type"].to_pylist()) == set(exact)
    for ty, got in zip(approx["event_type"].to_pylist(),
                       approx["n_users_hll"].to_pylist()):
        err = abs(got - exact[ty]) / max(exact[ty], 1)
        # p=12 -> sigma ~1.6%; 6% is ~4 sigma per group
        assert err <= 0.06, (
            f"HLL[{ty}] {got} vs exact {exact[ty]}: error {err:.3f} > 0.06"
        )
    return approx


def _cms_checked(sf_dir: str):
    """Count-min-sketch event counts with the CMS guarantees CHECKED vs
    exact per-user counts — approximate by design (no SQL oracle), so the
    correctness signal is these assertions failing loudly inside the
    driver's rows-only check: est >= true unconditionally (the one-sided
    CMS guarantee), and overshoot <= 4N/width (>=5-sigma slack for
    depth=4 rows; a broken hash/merge path blows straight through it)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    est = relops.events_cms_counts(sf_dir)
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    vc = pc.value_counts(t["user_id"])
    exact = {
        d["values"]: d["counts"] for d in vc.to_pylist()
    }
    n_total = t.num_rows
    width = 2048
    for uid, got in zip(est["user_id"].to_pylist(),
                        est["n_events_cms"].to_pylist()):
        true = exact.get(uid, 0)
        assert got >= true, f"CMS under-counted user {uid}: {got} < {true}"
        assert got <= true + 4 * n_total / width, (
            f"CMS overshoot for user {uid}: {got} vs {true} "
            f"(N={n_total}, width={width})"
        )
    return est


def _quantile_sketch_checked(sf_dir: str):
    """Uniform-compaction quantile sketch with a CHECKED rank-error bound
    vs the exact ranks — approximate by design (no SQL oracle), so the
    correctness signal is this assertion failing loudly inside the
    driver's rows-only check."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    approx = relops.events_quantile_sketch(sf_dir)
    t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )
    cents = pc.cast(
        pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
    ).to_numpy(zero_copy_only=False)
    cents = np.sort(cents)
    n = len(cents)
    for q, v in zip(approx["q_pct"].to_pylist(),
                    approx["approx_cents"].to_pylist()):
        # exact rank band of the returned value
        lo = np.searchsorted(cents, v, side="left")
        hi = np.searchsorted(cents, v, side="right")
        target = np.ceil(q / 100.0 * n)
        err = max(0, lo - target, target - hi) / max(n, 1)
        # s=256 samples/block bounds summed rank error by 1/(2s) ~ 0.2%
        # of n at ANY scale; 2% catches a broken compactor/merge instantly
        assert err <= 0.02, (
            f"q{q}: value {v} rank band [{lo},{hi}] vs target {target} "
            f"(n={n}): error {err:.4f} > 0.02")
    return approx


def _decontaminate_bloom_checked(sf_dir: str):
    """Bloom-filter decontamination with CHECKED semantics vs the exact
    broadcast-set result: zero false negatives (every exact hit is
    flagged), false-positive rate within the m/j design bound."""
    bloom = textops.decontaminate_bloom(sf_dir).to_pandas()
    exact = textops.decontaminate(sf_dir).to_pandas()
    b = dict(zip(bloom["doc_id"], bloom["contaminated"]))
    e = dict(zip(exact["doc_id"], exact["contaminated"]))
    assert set(b) == set(e), "bloom and exact saw different doc sets"
    fn = sum(1 for d, c in e.items() if c and not b[d])
    assert fn == 0, f"{fn} false negatives — bloom must never miss a hit"
    clean = [d for d, c in e.items() if not c]
    fp = sum(1 for d in clean if b[d])
    # m=2^20 bits, j=4 vs a benchmark-sized gram set: design FP rate is
    # ~(grams*j/m)^j — effectively zero at test scale; 2% catches a
    # broken hash/bitmap path instantly
    assert fp / max(len(clean), 1) <= 0.02, (
        f"bloom FP rate {fp}/{len(clean)} above bound")
    import pyarrow as _pa

    return _pa.Table.from_pandas(
        bloom.sort_values("doc_id").reset_index(drop=True),
        preserve_index=False)


def _assert_pruned_probe(stats: dict, allowed_dirs: list[str]) -> None:
    """Every file the probe read must live under a PROBED partition dir,
    and the probe must have skipped at least one index file — the round-5
    contract that the persisted layout prunes I/O, not just arithmetic."""
    import os as _os

    for f in stats["files_read"]:
        parent = _os.path.dirname(f)
        assert any(parent == d or parent.startswith(d + _os.sep)
                   for d in allowed_dirs), (
            f"probe read {f} outside its probed partitions"
        )
    assert len(stats["files_read"]) < stats["files_total"], (
        "probe read every index file — no I/O pruning"
    )


def _ann_lsh_checked(sf_dir: str):
    """LSH top-k over the PERSISTED bucket-partitioned index, with a
    CHECKED recall bound vs exact brute force — the approximate result has
    no SQL oracle, so the correctness signal is this assertion failing
    loudly inside the driver's rows-only check — plus the probed-partition
    I/O-pruning assertion."""
    approx, stats = ann.lsh_topk(sf_dir, return_stats=True)
    _assert_pruned_probe(stats, stats["dirs_probed"])
    assert stats["buckets_probed"] < stats["buckets_total"], (
        "LSH probe touched every bucket"
    )
    exact = ann.brute_force_topk(sf_dir)
    r = _ann_recall(approx, exact)
    # the index stores the SAME signatures the round-4 scan version
    # computed (4 planes x 24 tables): recall 0.98/1.00 at sf0.01/sf0.1 —
    # a bound this tight actually catches a broken index
    assert r >= 0.8, f"LSH recall {r:.3f} below bound 0.8 vs brute force"
    return approx


def _ann_ivf_checked(sf_dir: str):
    """IVF top-k probing the PERSISTED list-partitioned index, with a
    CHECKED recall bound vs exact brute force (see _ann_lsh_checked) and
    the probed-partition I/O-pruning assertion."""
    import os as _os

    approx, stats = ann.ivf_topk(sf_dir, return_stats=True)
    allowed = [
        _os.path.join(stats["index_dir"], f"list={c}")
        for c in stats["lists_probed"]
    ]
    for f in stats["files_read"]:
        assert _os.path.dirname(f) in allowed, (
            f"probe read {f} outside its probed partitions"
        )
    # strict pruning shows per QUERY (each probes n_probe of n_lists;
    # the 5-query union of drop-1-of-8 sets covers all lists) — a
    # 1-query probe proves the file-level pruning
    _, s1 = ann.ivf_topk(
        sf_dir, n_queries=1, index_dir=stats["index_dir"],
        return_stats=True,
    )
    assert len(s1["lists_probed"]) < s1["n_lists"], (
        "single-query IVF probe touched every list"
    )
    assert len(s1["files_read"]) < s1["files_total"], (
        "single-query IVF probe read every index file — no I/O pruning"
    )
    exact = ann.brute_force_topk(sf_dir)
    r = _ann_recall(approx, exact)
    # probe 7 of 8 exact-integer k-means lists: measured ~0.95 recall on
    # the no-cluster-structure synthetic embeddings (recall tracks the
    # scanned fraction there; clustered real data needs a smaller probe)
    assert r >= 0.8, f"IVF recall {r:.3f} below bound 0.8 vs brute force"
    return approx


def oracle_sql() -> dict[str, str]:
    sql = {
        "crawl_bfs": f"""
WITH RECURSIVE corpus AS (
  SELECT url, text, regexp_extract(url, '^http://([^/]+)', 1) AS host
  FROM read_parquet('{_SF001_CORPUS}')
),
pages AS (
  SELECT * FROM corpus WHERE {_HTML_FILTER}
),
bfs(url, host, depth) AS (
  SELECT url, host, 0 FROM corpus WHERE url = 'http://' || host || '/'
  UNION
  SELECT cand.cand, b.host, b.depth + 1
  FROM bfs b
  JOIN pages p ON p.url = CASE
      WHEN b.url LIKE '%/redirect/%'
      THEN 'http://' || b.host || '/' || split_part(b.url, '/redirect/', 2)
      ELSE b.url END,
  LATERAL (
    SELECT CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
                ELSE 'http://' || b.host || h1 END AS cand
    FROM (
      SELECT split_part(split_part(href, '#', 1), '?', 1) AS h1
      FROM unnest(string_split(p.text, chr(10))) AS t(href)
    )
  ) AS cand
  WHERE b.depth < 64
    AND p.text <> ''
    AND cand.cand LIKE 'http://' || b.host || '/%'
    AND cand.cand NOT LIKE '%/private/%'
)
SELECT b.url AS url_norm, CAST(MIN(b.depth) AS BIGINT) AS depth
FROM bfs b
WHERE EXISTS (SELECT 1 FROM corpus c WHERE c.url = b.url)
   OR (b.url LIKE '%/redirect/%' AND EXISTS (
         SELECT 1 FROM pages p
         WHERE p.url = 'http://' || b.host || '/' ||
               split_part(b.url, '/redirect/', 2)))
GROUP BY b.url
""",
        "crawl_bfs_with_query": f"""
WITH RECURSIVE corpus AS (
  SELECT url, text, regexp_extract(url, '^http://([^/]+)', 1) AS host
  FROM read_parquet('{_SF001_CORPUS}')
),
pages AS (
  SELECT * FROM corpus WHERE {_HTML_FILTER}
),
bfs(url, host, depth) AS (
  SELECT url, host, 0 FROM corpus WHERE url = 'http://' || host || '/'
  UNION
  -- trim_query=False/trim_fragment=False: the candidate keeps query AND
  -- fragment; only the FETCH key strips the fragment (HTTP transport)
  SELECT cand.cand, b.host, b.depth + 1
  FROM bfs b
  JOIN pages p ON p.url = CASE
      WHEN split_part(b.url, '#', 1) LIKE '%/redirect/%'
      THEN 'http://' || b.host || '/' ||
           split_part(split_part(b.url, '#', 1), '/redirect/', 2)
      ELSE split_part(b.url, '#', 1) END,
  LATERAL (
    SELECT CASE WHEN href LIKE 'http://%' OR href LIKE 'https://%' THEN href
                ELSE 'http://' || b.host || href END AS cand
    FROM unnest(string_split(p.text, chr(10))) AS t(href)
  ) AS cand
  WHERE b.depth < 64
    AND p.text <> ''
    AND cand.cand LIKE 'http://' || b.host || '/%'
    AND cand.cand NOT LIKE '%/private/%'
)
SELECT b.url AS url_norm, CAST(MIN(b.depth) AS BIGINT) AS depth
FROM bfs b
WHERE EXISTS (SELECT 1 FROM corpus c
              WHERE c.url = split_part(b.url, '#', 1))
   OR (split_part(b.url, '#', 1) LIKE '%/redirect/%' AND EXISTS (
         SELECT 1 FROM pages p
         WHERE p.url = 'http://' || b.host || '/' ||
               split_part(split_part(b.url, '#', 1), '/redirect/', 2)))
GROUP BY b.url
""",
        "crawl_edges": f"""
SELECT url AS src_url, unnest(string_split(text, chr(10))) AS href_norm
FROM read_parquet('{_SF001_CORPUS}')
WHERE {_HTML_FILTER} AND text <> ''
""",
        "crawl_edges_joined": _EDGES_JOINED_SQL,
        # aggregate-of-an-aggregate: per-page out-degree, then histogram
        "crawl_degree_hist": f"""
WITH cand AS ({_EDGES_JOINED_SQL}),
deg AS (
  SELECT src_url, CAST(COUNT(*) AS BIGINT) AS degree
  FROM cand GROUP BY src_url
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_pages
FROM deg GROUP BY degree
""",
        "crawl_pagerank": _pagerank_sql(),
        # domain-level link matrix over the SAME distinct resolved edge
        # set as pagerank/triangles (closed over corpus pages)
        "crawl_host_matrix": f"""
WITH pages AS (
  SELECT url FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
edges AS (
  SELECT src, dst FROM cand
  WHERE dst IN (SELECT url FROM pages) AND src <> dst
)
SELECT regexp_extract(src, '^http://([^/]+)', 1) AS src_host,
       regexp_extract(dst, '^http://([^/]+)', 1) AS dst_host,
       CAST(count(*) AS BIGINT) AS n_links
FROM edges GROUP BY src_host, dst_host
ORDER BY src_host, dst_host
""",
        # undirected distinct link graph; a<b canonicalization counts each
        # triangle exactly once on both engines
        "crawl_triangles": f"""
WITH pages AS (
  SELECT url FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
edges AS (
  SELECT src, dst FROM cand
  WHERE dst IN (SELECT url FROM pages) AND src <> dst
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges
)
SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_und_edges,
       CAST((SELECT COUNT(*)
             FROM und e1
             JOIN und e2 ON e1.b = e2.a
             JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
         AS n_triangles
""",
        "crawl_text_identity": f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_pages, CAST(COUNT(*) AS BIGINT) AS n_match
FROM read_parquet('{_SF001_CORPUS}')
WHERE {_HTML_FILTER}
""",
        "crawl_host_stats": f"""
SELECT regexp_extract(url, '^http://([^/]+)', 1) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_chars
FROM read_parquet('{_SF001_CORPUS}')
GROUP BY host
""",
        "crawl_filter_by": f"""
SELECT url FROM read_parquet('{_SF001_CORPUS}')
WHERE url LIKE 'http://h0.example.com/%'
""",
        "events_topk_users": """
SELECT user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY user_id
ORDER BY total_cents DESC, user_id
LIMIT 10
""",
        "brand_revenue": """
SELECT p.p_brand,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
        "supplier_nation_balance": """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_cents,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "events_distinct_users": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
        # same RE2 pattern evaluated by pyarrow and DuckDB — exact parity
        "docs_bpe_token_counts": r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text,
         '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+'))
         AS BIGINT) AS n_bpe_tokens
FROM documents
""",
        # same whitespace tokenization + stopword membership on both sides
        "docs_stopword_stats": r"""
SELECT doc_id,
  CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
           w -> w IN ('the','a','of','and','to','in','is','it')))
       AS BIGINT) AS n_stopwords
FROM documents
""",
        "docs_token_stats": r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
""",
        # same tokenization as the pipeline (lower + \s+ split, empties
        # dropped); n-grams recomputed by 1-based list indexing
        "docs_repetition_stats": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ts
  FROM documents
),
bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
  FROM toks, UNNEST(range(1, len(ts))) AS u(i)
),
tg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
),
bstats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dup_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_n
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
  GROUP BY doc_id
),
tstats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_trigrams,
         CAST(MAX(c) AS BIGINT) AS top_trigram_n
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM tg GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(b.n_dup_bigrams, 0) AS BIGINT) AS n_dup_bigrams,
  CAST(COALESCE(b.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
  CAST(COALESCE(t.n_trigrams, 0) AS BIGINT) AS n_trigrams,
  CAST(COALESCE(t.top_trigram_n, 0) AS BIGINT) AS top_trigram_n
FROM documents d
LEFT JOIN bstats b USING (doc_id)
LEFT JOIN tstats t USING (doc_id)
""",
        # same tokenization as the pipeline; eval set = docs with
        # doc_id % 97 == 0, shingles n=3, flag = any shared shingle
        "docs_decontaminate": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, list_aggregate(ts[i:i+2], 'string_agg', ' ') AS g
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hit AS (
  SELECT DISTINCT doc_id FROM grams JOIN ev USING (g) WHERE doc_id % 97 <> 0
)
SELECT d.doc_id,
       CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS contaminated
FROM documents d
LEFT JOIN hit h USING (doc_id)
WHERE d.doc_id % 97 <> 0
""",
        # mod-2^64 affine hash in HUGEINT; top 12 bits pick the bucket
        # (constants interpolated from textops so they cannot drift)
        "docs_hash_split": f"""
WITH h AS (
  SELECT doc_id,
         CAST(((doc_id::HUGEINT * {textops._SPLIT_MUL}
                + {textops._SPLIT_ADD}) % 18446744073709551616)
              // 4503599627370496 AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 3276 THEN 'train'
            WHEN bucket < 3686 THEN 'val'
            ELSE 'test' END AS split
FROM h
""",
        # independent affine hash (xxhash64 prime mixers), per-lang
        # keep-rate in 4096ths — constants interpolated from textops
        "docs_stratified_sample": f"""
WITH h AS (
  SELECT doc_id, lang,
         CAST(((doc_id::HUGEINT * {textops._SAMPLE_MUL}
                + {textops._SAMPLE_ADD}) % 18446744073709551616)
              // 4503599627370496 AS BIGINT) AS bucket
  FROM documents
),
r(lang, lim) AS (VALUES {", ".join(f"('{l}', {v})" for l, v in textops.SAMPLE_RATES_4096.items())})
SELECT h.doc_id, h.lang
FROM h JOIN r ON h.lang = r.lang
WHERE h.bucket < r.lim
""",
        "docs_quality": r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
       CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
       CAST(length(regexp_extract_all(text, '\S')) AS BIGINT) AS n_nonspace
FROM documents
""",
        "docs_quality_label": r"""
SELECT doc_id,
       CASE WHEN length(regexp_extract_all(text, '\S+')) < 20 THEN 'short'
            WHEN length(regexp_extract_all(text, '\S+')) > 2000 THEN 'long'
            ELSE 'keep' END AS label
FROM documents
""",
        "docs_clean_text": r"""
SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS clean
FROM documents
""",
        "docs_lang_counts": """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
        "docs_exact_dedup": """
SELECT text, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
""",
        # exact re-derivation of the LSH+verify output: every emitted pair
        # has true 3-shingle Jaccard >= 0.5, and on this corpus the banding
        # has perfect recall (verified empirically at sf0.01 AND sf0.1), so
        # brute-force Jaccard in SQL reproduces the EXACT pair set
        "dedup_minhash_lsh": r"""
WITH words AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
sh AS (
  SELECT doc_id,
    list_distinct(CASE
      WHEN len(w) = 0 THEN []
      WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      ELSE list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    END) AS sset
  FROM words),
e AS (SELECT doc_id, unnest(sset) AS s FROM sh),
counts AS (SELECT doc_id, len(sset) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b
FROM inter
JOIN counts ca ON ca.doc_id = id_a
JOIN counts cb ON cb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
""",
        # exact re-derivation of the simhash kernel: word hash = first 8
        # bytes of md5 (the kernel uses md5 precisely so SQL can recompute
        # it), per-bit +/-1 majority, 4x16-bit band blocking (pigeonhole-
        # complete for Hamming<=3), exact banded-Hamming verification
        "dedup_simhash": r"""
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word FROM documents
),
h AS (SELECT doc_id, md5(word) AS hx FROM w),
bitsum AS (
  SELECT doc_id, i,
    SUM(CASE WHEN ((strpos('0123456789abcdef',
                           substring(hx, 16 - CAST(i // 4 AS INT), 1)) - 1)
              >> (i % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM h, range(0, 64) t(i)
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id,
    SUM(CASE WHEN acc > 0 AND i // 16 = 0 THEN (CAST(1 AS BIGINT) << CAST(i % 16 AS INT)) ELSE 0 END) AS b0,
    SUM(CASE WHEN acc > 0 AND i // 16 = 1 THEN (CAST(1 AS BIGINT) << CAST(i % 16 AS INT)) ELSE 0 END) AS b1,
    SUM(CASE WHEN acc > 0 AND i // 16 = 2 THEN (CAST(1 AS BIGINT) << CAST(i % 16 AS INT)) ELSE 0 END) AS b2,
    SUM(CASE WHEN acc > 0 AND i // 16 = 3 THEN (CAST(1 AS BIGINT) << CAST(i % 16 AS INT)) ELSE 0 END) AS b3
  FROM bitsum GROUP BY doc_id
)
SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
FROM bands a JOIN bands b
  ON a.doc_id < b.doc_id
 AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
""",
        # connected components (transitive closure + min) over the SAME
        # brute-force-verified Jaccard pair set the minhash oracle derives
        "dedup_clusters": r"""
WITH RECURSIVE
words AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
sh AS (
  SELECT doc_id,
    list_distinct(CASE
      WHEN len(w) = 0 THEN []
      WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      ELSE list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    END) AS sset
  FROM words),
e AS (SELECT doc_id, unnest(sset) AS s FROM sh),
counts AS (SELECT doc_id, len(sset) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN counts ca ON ca.doc_id = id_a
  JOIN counts cb ON cb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
)
SELECT CAST(src AS BIGINT) AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
FROM reach GROUP BY src
""",
        # the fingerprint kernel is a code-point polynomial hash mod the
        # Mersenne prime 2^61-1 (documents are ASCII, so code points ==
        # utf-8 bytes); HUGEINT keeps the fold exact
        "docs_fingerprints": r"""
SELECT doc_id,
  CAST(CASE WHEN length(text) = 0 THEN 0 ELSE
    list_reduce(
      list_prepend(CAST(0 AS HUGEINT),
        list_transform(range(1, length(text) + 1),
                       i -> CAST(unicode(text[i]) AS HUGEINT))),
      (a, b) -> (a * 256 + b + 1) % 2305843009213693951)
  END AS BIGINT) AS fp
FROM documents
""",
        # the language-ID heuristic re-derived: distinct lowercase words,
        # per-language stopword hits, first-strictly-greater scan over
        # languages in sorted order (de,en,es,fr), default 'en'
        "docs_langid": r"""
WITH ws AS (
  SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
n AS (
  SELECT doc_id,
    len(list_intersect(w, ['der','die','das','und','ist','nicht','ein'])) AS n_de,
    len(list_intersect(w, ['the','a','of','and','to','in','is','it'])) AS n_en,
    len(list_intersect(w, ['el','la','los','y','es','un','una'])) AS n_es,
    len(list_intersect(w, ['le','la','les','et','est','un','une'])) AS n_fr
  FROM ws
)
SELECT doc_id,
  CASE WHEN n_fr > GREATEST(0, n_de, n_en, n_es) THEN 'fr'
       WHEN n_es > GREATEST(0, n_de, n_en) THEN 'es'
       WHEN n_en > GREATEST(0, n_de) THEN 'en'
       WHEN n_de > 0 THEN 'de'
       ELSE 'en' END AS lang_pred
FROM n
""",
        # full decode-stage oracle: md5 digest (the decoder uses md5 so SQL
        # can recompute it) + byte-range histogram features; documents are
        # ASCII so char classes count bytes exactly
        "multimodal_decode": r"""
SELECT doc_id,
  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
  CAST(CASE WHEN length(text) = 0 THEN 0
            ELSE ascii(substring(text, 1, 1)) END AS BIGINT) AS first_byte,
  md5(text) AS digest,
  CAST(length(regexp_extract_all(text, '[\x00-\x1f]')) AS BIGINT) AS f0,
  CAST(length(regexp_extract_all(text, '[\x20-\x3f]')) AS BIGINT) AS f1,
  CAST(length(regexp_extract_all(text, '[\x40-\x5f]')) AS BIGINT) AS f2,
  CAST(length(regexp_extract_all(text, '[\x60-\x7f]')) AS BIGINT) AS f3,
  CAST(0 AS BIGINT) AS f4, CAST(0 AS BIGINT) AS f5,
  CAST(0 AS BIGINT) AS f6, CAST(0 AS BIGINT) AS f7
FROM documents
""",
        "dedup_embedding_cosine": """
SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
""",
        "ann_brute_topk": """
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id
FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, v.embedding) DESC,
                    v.vec_id
         ) AS rank
  FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
  WHERE q.vec_id < 5
) WHERE rank <= 10
""",
        "multimodal_meta": """
SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
FROM documents
""",
        # the image corpus is synthesized in closed form from doc_id
        # (multimodal.image_payloads), so the oracle recomputes what the
        # REAL header parser must recover from the bytes: the round trip
        # (build header -> parse header) must be an exact inverse
        "multimodal_dims": """
SELECT doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
  CAST(16 + (doc_id * 7) % 1000 AS BIGINT) AS width,
  CAST(16 + (doc_id * 13) % 800 AS BIGINT) AS height,
  CAST(CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 135 END AS BIGINT)
    AS color,
  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 39 ELSE 13 END
       + octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
FROM documents
""",
        # frame arithmetic + md5 over the kept 64-byte frames (stride 4);
        # documents are ASCII so substr-on-text == byte slicing
        "multimodal_frame_sample": """
SELECT doc_id,
  CAST(octet_length(CAST(text AS BLOB)) // 64 AS BIGINT) AS n_frames,
  CAST((octet_length(CAST(text AS BLOB)) // 64 + 3) // 4 AS BIGINT) AS n_sampled,
  md5(COALESCE(array_to_string(
    list_transform(range(0, CAST(octet_length(CAST(text AS BLOB)) // 64 AS BIGINT), 4),
                   i -> substr(text, CAST(i * 64 + 1 AS BIGINT), 64)),
    ''), '')) AS sample_digest
FROM documents
""",
        "q1_returnflag_agg": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "mktsegment_revenue": """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
        "orders_lineitem_join": """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
        # the bloom prefilter is transparent (false positives die in the
        # exact join behind it), so the plain join IS the oracle
        "urgent_order_revenue": """
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
""",
        "orders_price_quantiles": """
SELECT o_orderpriority,
       quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.9) AS p90_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
""",
        "docs_top_per_lang": """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 3
""",
        "lineitem_topk": """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
FROM lineitem
ORDER BY price_cents DESC, l_orderkey, l_linenumber
LIMIT 20
""",
        "events_window_agg": """
SELECT event_type,
       CAST(floor((epoch_us(ts) // 1000000) / 3600.0) AS BIGINT) AS win,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type, win
""",
        "events_sliding_agg": """
SELECT event_type, win_start,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT event_type, value,
         unnest([epoch_us(ts) // 1000000 // 1800,
                 epoch_us(ts) // 1000000 // 1800 - 1]) AS win_start
  FROM events
)
GROUP BY event_type, win_start
""",
        "docs_vocab_topk": r"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 50
""",
        # same lower + \s+ tokenization as the n-gram family; bigrams
        # never cross a document boundary
        "docs_bigrams_topk": r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'),
                     w -> w <> '') AS ts
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS gram
  FROM toks WHERE len(ts) >= 2
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams GROUP BY gram
ORDER BY n DESC, gram
LIMIT 20
""",
        # exact heavy hitters: every token with count * k > total tokens
        "docs_heavy_tokens": r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS token
  FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks),
c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY token)
SELECT c.token, c.cnt AS n FROM c, n WHERE c.cnt * 200 > n.total
""",
        "events_sessionize": """
WITH d AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev IS NULL
                      OR epoch_us(ts) - epoch_us(prev) > 1800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM d GROUP BY user_id
""",
        # DuckDB's native ASOF JOIN is the oracle for the composed
        # partition-by-user + sorted-merge as-of join
        "events_asof_join": """
WITH purchases AS (
  SELECT user_id, ts,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) AS purchase_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       epoch_us(p.ts) AS purchase_ts_us,
       p.purchase_cents
FROM clicks c ASOF JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
        # interval-predicate self-join; distinct clicks so duplicate
        # (user, ts) click rows don't double the grouped counts
        "events_range_join": """
WITH clicks AS (
  SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(ROUND(p.value * 100) AS BIGINT)) AS BIGINT)
         AS purchase_cents_sum
FROM clicks c
JOIN events p
  ON p.user_id = c.user_id AND p.event_type = 'purchase'
 AND p.ts > c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts
GROUP BY c.user_id, c.ts
""",
        "region_nation_counts": """
SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
        # events collapsed per (user, ts) first so the running sum is
        # deterministic under timestamp ties; ts_us is unique per user
        # after the collapse, so RANGE == ROWS framing
        "events_user_running": """
WITH per AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS step_cents
  FROM events GROUP BY user_id, ts
)
SELECT user_id, ts_us,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       step_cents,
       CAST(SUM(step_cents) OVER w AS BIGINT) AS cum_cents
FROM per
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
""",
        "lineitem_rollup": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
        "lineitem_cube": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""",
        "customers_without_big_orders": """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice >= 450000.0)
GROUP BY n.n_name
""",
        "customers_with_big_orders": """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 450000.0)
GROUP BY c.c_mktsegment
""",
        "events_pivot": """
SELECT user_id,"""
        + ",".join(
            f"""
  CAST(SUM(CASE WHEN event_type = '{et}'
                THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
    AS {et}_cents"""
            for et in ("click", "view", "purchase", "signup", "error")
        )
        + """,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
""",
        # weakly-connected components: transitive closure over the
        # symmetric edge set, component = min reachable url
        "crawl_components": f"""
WITH RECURSIVE pages AS (
  SELECT url FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
edges AS (
  SELECT src, dst FROM cand
  WHERE dst IN (SELECT url FROM pages) AND src <> dst
),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach(a, b) AS (
  SELECT url, url FROM pages
  UNION
  SELECT r.a, e.dst FROM reach r JOIN sym e ON r.b = e.src
)
SELECT a AS url, MIN(b) AS component FROM reach GROUP BY a
""",
        # full inverted-index postings; docs are single rows so tf is a
        # plain grouped count on both sides
        "docs_postings": r"""
SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
FROM (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token
  FROM documents
)
GROUP BY token, doc_id
""",
        # fixed-point centroid numerators: float32 -> DOUBLE is exact and
        # DOUBLE multiply + floor are bit-identical in numpy and SQL
        "embeddings_label_centroids": """
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS sum_scaled,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
GROUP BY label, dim
""",
        # two unrolled Lloyd rounds, exact in integers: fixed-point
        # vectors, int squared-L2, argmin tie-break = min(dist*k+cid)%k,
        # truncating-// centroid mean (matches sign(s)*(|s|//n))
        "embeddings_kmeans": """
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS x
  FROM embeddings
),
c0 AS (SELECT vec_id AS cluster, dim, x AS c FROM v WHERE vec_id < 8),
d1 AS (
  SELECT v.vec_id, c0.cluster,
         SUM((v.x - c0.c) * (v.x - c0.c)) AS dist
  FROM v JOIN c0 USING (dim)
  GROUP BY v.vec_id, c0.cluster
),
a1 AS (
  SELECT vec_id, CAST(MIN(dist * 8 + cluster) % 8 AS BIGINT) AS cluster
  FROM d1 GROUP BY vec_id
),
s1 AS (
  SELECT a1.cluster, v.dim,
         CAST(SUM(v.x) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM v JOIN a1 USING (vec_id) GROUP BY a1.cluster, v.dim
),
c1 AS (SELECT cluster, dim, s // n AS c FROM s1),
d2 AS (
  SELECT v.vec_id, c1.cluster,
         SUM((v.x - c1.c) * (v.x - c1.c)) AS dist
  FROM v JOIN c1 USING (dim)
  GROUP BY v.vec_id, c1.cluster
)
SELECT vec_id, CAST(MIN(dist * 8 + cluster) % 8 AS BIGINT) AS cluster
FROM d2 GROUP BY vec_id
""",
        # threshold in pure integers: qty < 0.2*avg  <=>  5*qty*n < sum
        "small_quantity_revenue": """
WITH pq AS (
  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN pq ON l.l_partkey = pq.l_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * pq.n < pq.s
""",
        # conversion = first purchase strictly after first signup, landing
        # within 1 hour of it
        "events_funnel": """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS fs
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT user_id, epoch_us(ts) AS ts FROM events
  WHERE event_type = 'purchase'
),
fp AS (
  SELECT p.user_id, MIN(p.ts) AS fpa
  FROM p JOIN s USING (user_id) WHERE p.ts > s.fs
  GROUP BY p.user_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup_users,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM p)
         AS n_purchase_users,
       CAST(COUNT(*) FILTER (WHERE fp.fpa - s.fs <= 3600000000) AS BIGINT)
         AS n_converted
FROM s LEFT JOIN fp USING (user_id)
""",
        # ordered string agg — (ts, event_id) makes ties deterministic
        "events_user_paths": """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
""",
        # z-score in pure integers: (n*x-s)^2 > z^2*(n*ssq-s^2), z=2
        "events_outliers": """
WITH e AS (
  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
st AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(cents * cents) AS BIGINT) AS ssq
  FROM e GROUP BY user_id
)
SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_outliers
FROM e JOIN st USING (user_id)
WHERE st.n >= 2
  AND (st.n * e.cents - st.s) * (st.n * e.cents - st.s)
      > 4 * (st.n * st.ssq - st.s * st.s)
GROUP BY e.user_id
""",
        # band self-join: unordered same-user pairs within the window
        "events_close_pairs": """
SELECT e1.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id
 AND ABS(epoch_us(e1.ts) - epoch_us(e2.ts)) <= 300000000
GROUP BY e1.user_id
""",
        # cohort = epoch-week of first event; one row per (cohort, offset)
        "events_cohort_retention": """
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts) // 604800000000) AS cw
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w FROM events
)
SELECT CAST(f.cw AS BIGINT) AS cohort_week,
       CAST(a.w - f.cw AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
""",
        "nation_customer_supplier_outer": """
WITH c AS (
  SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS nc
  FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
  GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS ns
  FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_building_customers,
       CAST(COALESCE(s.ns, 0) AS BIGINT) AS n_rich_suppliers
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
""",
        # same tokenization as the pipeline; integer idf weight
        # (n_docs * SCALE) // df — constants interpolated from the module
        "docs_tfidf_topk": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ts
  FROM documents
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
tf AS (
  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks, UNNEST(ts) AS u(t)
  WHERE t IN ({terms})
  GROUP BY doc_id, t
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT tf.doc_id,
       CAST(SUM(tf.tf * ((nd.n * {scale}) // df.df)) AS BIGINT) AS score
FROM tf JOIN df USING (term) CROSS JOIN nd
GROUP BY tf.doc_id
ORDER BY score DESC, doc_id LIMIT {k}
""".format(
            terms=",".join(f"'{t}'" for t in retrieval.TFIDF_TERMS),
            scale=retrieval.TFIDF_SCALE,
            k=20,
        ),
        # 5-token shingles (same tokenization); a gram is shared iff it
        # appears in >= 2 distinct documents; docs with no shared grams
        # are absent on both sides
        "docs_dup_ngrams": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ts
  FROM documents
),
g AS (
  SELECT doc_id, list_aggregate(ts[i:i+4], 'string_agg', ' ') AS gram
  FROM toks, UNNEST(range(1, len(ts) - 3)) AS u(i)
),
per AS (
  SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM g GROUP BY doc_id, gram
),
shared AS (SELECT gram FROM per GROUP BY gram HAVING COUNT(*) >= 2)
SELECT per.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared_grams,
       CAST(SUM(per.n_pos) AS BIGINT) AS n_shared_positions
FROM per JOIN shared USING (gram)
GROUP BY per.doc_id
""",
    }
    # survivors = the canonical (min-doc_id) row of every cluster: wrap the
    # clusters oracle so the two can never disagree on the graph
    sql["dedup_survivors"] = (
        "SELECT doc_id FROM (\n"
        + sql["dedup_clusters"]
        + "\n) WHERE doc_id = cluster_id"
    )
    # per-source duplication report: wrap the same clusters oracle so the
    # rollup can never disagree with the graph it reports on
    sql["dedup_source_stats"] = (
        "WITH cl AS (\n" + sql["dedup_clusters"] + "\n)\n"
        + """SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cl.cluster_id <> d.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dups,
       CAST(SUM(CASE WHEN cl.cluster_id <> d.doc_id THEN 1 ELSE 0 END)
            * 4096 // COUNT(*) AS BIGINT) AS dup_ratio_4096
FROM documents d JOIN cl ON d.doc_id = cl.doc_id
GROUP BY 1"""
    )
    # int8-quantized dot-product top-k: the quantization contract is
    # sign * (|FLOOR(v*1e6)| * 127 // max|.|) — magnitude floor-division
    # because DuckDB's // TRUNCATES toward zero while numpy's floors, so
    # only the non-negative form is engine-identical
    # defaults pulled straight from the Python signatures so query and
    # oracle can never desynchronize if a default parameter changes
    _qt = inspect.signature(ann.quantized_topk).parameters
    _qt_nq, _qt_k = _qt["n_queries"].default, _qt["k"].default
    sql["ann_quantized_topk"] = f"""
WITH f AS (
  SELECT vec_id, i,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS fi
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
),
mm AS (SELECT vec_id, MAX(ABS(fi)) AS m FROM f GROUP BY 1),
q AS (
  SELECT f.vec_id, f.i,
         CASE WHEN mm.m = 0 THEN 0
              WHEN fi < 0 THEN -((-fi) * 127 // mm.m)
              ELSE fi * 127 // mm.m END AS qi
  FROM f JOIN mm USING (vec_id)
),
s AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
         CAST(SUM(a.qi * b.qi) AS BIGINT) AS score_q
  FROM q a JOIN q b ON a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {_qt_nq}
  GROUP BY 1, 2
)
SELECT query_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score_q DESC, vec_id) AS BIGINT)
         AS rank,
       vec_id, score_q
FROM s
QUALIFY rank <= {_qt_k}
"""
    # per-list audit of the PERSISTED IVF index (round 5): the Ray side
    # aggregates the index's own partition files; the oracle wraps the
    # exact-integer k-means twin, so the physical layout and the unrolled
    # CTE can never disagree on a single vector's list assignment
    sql["ann_ivf_index_stats"] = f"""
WITH km AS ({sql["embeddings_kmeans"]})
SELECT CAST(cluster AS BIGINT) AS list_id,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MIN(vec_id) AS BIGINT) AS min_vec_id,
       CAST(MAX(vec_id) AS BIGINT) AS max_vec_id,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM km GROUP BY 1
"""
    # exact discrete p90 — same quantile_disc convention the median twin
    # probes (1-based rank ceil(q*n))
    sql["orders_price_p90"] = """
SELECT o_orderpriority,
       quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.9)
         AS p90_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1
"""
    # declared-vs-predicted language cross-tab: wraps the langid twin so
    # the confusion matrix and the per-doc prediction can never disagree
    sql["docs_langid_confusion"] = f"""
WITH pred AS ({sql["docs_langid"]})
SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2
"""
    # overlapping token-window chunking (window 64, stride 48): DuckDB
    # list slices are 1-based end-inclusive and clamp at the list end,
    # exactly the tokens[pos : pos+64] numpy gather; md5 of the
    # space-joined chunk text matches hashlib.md5 byte for byte
    sql["docs_chunks"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ts
  FROM documents
),
c AS (
  SELECT doc_id, ts, len(ts) AS n,
         unnest(range(0, len(ts), 48)) AS pos
  FROM toks WHERE len(ts) > 0
)
SELECT doc_id, CAST(pos // 48 AS BIGINT) AS chunk_id,
       CAST(pos AS BIGINT) AS pos,
       CAST(LEAST(64, n - pos) AS BIGINT) AS n_tokens,
       md5(array_to_string(ts[pos + 1 : pos + 64], ' ')) AS chunk_hash
FROM c
"""
    # freshness re-crawl priority: age x (1 + indegree) over the resolved
    # graph; "now" = the corpus's own max warc_ts (deterministic)
    _rk = inspect.signature(crawl_recrawl_priority).parameters["k"].default
    sql["crawl_recrawl_priority"] = f"""
WITH pageset AS (
  SELECT url, warc_ts FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
edges AS (
  SELECT src, dst FROM cand
  WHERE dst IN (SELECT url FROM pageset) AND src <> dst
),
ind AS (
  SELECT dst AS url, CAST(COUNT(*) AS BIGINT) AS indeg
  FROM edges GROUP BY dst
),
m AS (SELECT MAX(epoch_us(warc_ts)) AS mx FROM pageset)
SELECT p.url,
       CAST((m.mx - epoch_us(p.warc_ts)) // 1000000 AS BIGINT) AS age_s,
       CAST(COALESCE(i.indeg, 0) AS BIGINT) AS indeg,
       CAST(((m.mx - epoch_us(p.warc_ts)) // 1000000)
            * (1 + COALESCE(i.indeg, 0)) AS BIGINT) AS priority
FROM pageset p CROSS JOIN m LEFT JOIN ind i ON i.url = p.url
ORDER BY priority DESC, p.url LIMIT {_rk}
"""
    # per-page external-link ratio over the distinct candidate set
    sql["crawl_outlink_spam"] = f"""
WITH cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
h AS (
  SELECT src, dst,
         regexp_extract(src, '^https?://([^/]+)', 1) AS sh,
         regexp_extract(dst, '^https?://([^/]+)', 1) AS dh
  FROM cand
  WHERE src <> dst  -- the extract stage drops self-links (norm != url)
)
SELECT src AS url, CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(*) FILTER (WHERE sh <> dh) AS BIGINT) AS n_external,
       CAST((COUNT(*) FILTER (WHERE sh <> dh)) * 4096 // COUNT(*)
            AS BIGINT) AS ext_ratio_4096
FROM h GROUP BY src
"""
    # the fused curation decision: length gate + top-bigram repetition gate
    # + decontamination + hash split computed per doc, survivor flag from
    # the (wrapped) clusters oracle, keep = the AND of the four gates
    sql["docs_curation"] = f"""
WITH surv AS ({sql["dedup_survivors"]}),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ts
  FROM documents WHERE doc_id % 97 <> 0
),
nt AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM toks),
bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
  FROM toks, UNNEST(range(1, len(ts))) AS u(i)
),
bs AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bi, CAST(MAX(c) AS BIGINT) AS top_bi
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
  GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS u(i)
),
evtoks AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ts
  FROM documents WHERE doc_id % 97 = 0
),
ev AS (
  SELECT DISTINCT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM evtoks, UNNEST(range(1, len(ts) - 1)) AS u(i)
),
hit AS (SELECT DISTINCT doc_id FROM g3 JOIN ev USING (g)),
h AS (
  SELECT doc_id,
         CAST(((doc_id::HUGEINT * {textops._SPLIT_MUL}
                + {textops._SPLIT_ADD}) % 18446744073709551616)
              // 4503599627370496 AS BIGINT) AS bucket
  FROM documents
)
SELECT d.doc_id,
  nt.n_tokens,
  CAST(CASE WHEN nt.n_tokens BETWEEN 20 AND 2000 THEN 1 ELSE 0 END AS BIGINT)
    AS q_ok,
  CAST(CASE WHEN COALESCE(bs.n_bi, 0) = 0
            OR bs.top_bi * 100 <= 20 * bs.n_bi THEN 1 ELSE 0 END AS BIGINT)
    AS rep_ok,
  CAST(CASE WHEN ht.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
    AS uncontaminated,
  CAST(CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS survivor,
  CASE WHEN h.bucket < 3276 THEN 'train'
       WHEN h.bucket < 3686 THEN 'val'
       ELSE 'test' END AS split,
  CAST(CASE WHEN nt.n_tokens BETWEEN 20 AND 2000
             AND (COALESCE(bs.n_bi, 0) = 0 OR bs.top_bi * 100 <= 20 * bs.n_bi)
             AND ht.doc_id IS NULL
             AND s.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d
JOIN nt USING (doc_id)
JOIN h USING (doc_id)
LEFT JOIN bs USING (doc_id)
LEFT JOIN hit ht USING (doc_id)
LEFT JOIN surv s USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""
    # ---- round 4 ----
    # integer-exact BM25 (k1=1.2, b=0.75 multiplied through by common
    # denominators — see retrieval.docs_bm25_topk): idf_int =
    # ((N-df+1)*4096)//(df+1), tfn_int = (44*T*tf*4096)//(20*T*tf+6*T+
    # 18*dl*N); same lower+\s+ tokenization as the pipeline
    sql["docs_bm25_topk"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
  FROM documents
),
s AS (SELECT count(*) AS t_total FROM toks),
nd AS (SELECT count(*) AS n_docs FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
qterms(term) AS (VALUES ('hash'), ('join'), ('sort'), ('vector')),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM toks JOIN qterms ON tok = term GROUP BY term
),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf
  FROM toks JOIN qterms ON tok = term GROUP BY doc_id, tok
),
scored AS (
  SELECT tf.doc_id,
         (((nd.n_docs - df.df + 1) * 4096) // (df.df + 1))
         * ((44 * s.t_total * tf.tf * 4096)
            // (20 * s.t_total * tf.tf + 6 * s.t_total
                + 18 * dl.dl * nd.n_docs)) AS term_score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id, s, nd
)
SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20
"""
    # fixed-width token-segment global dedup: first occurrence of every
    # 10-token segment wins (min (doc_id, seg_no)); docs reassembled from
    # surviving segments in order. string_split(text,' ') mirrors the
    # pipeline's literal single-space split (rejoin reproduces bytes).
    sql["docs_segment_dedup"] = r"""
WITH segs AS (
  SELECT doc_id, seg_no,
         array_to_string(ts[seg_no*10+1 : (seg_no+1)*10], ' ') AS seg
  FROM (
    SELECT doc_id, ts, unnest(range(0, (len(ts)+9)//10)) AS seg_no
    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
  )
),
winners AS (
  SELECT doc_id, seg_no, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
  FROM segs
)
SELECT doc_id,
       string_agg(seg, ' ' ORDER BY seg_no) AS text_dedup,
       count(*) AS n_kept
FROM winners WHERE rn = 1
GROUP BY doc_id
ORDER BY doc_id
"""
    # heavy-hitter membership ratio: the "common" set is freq >= total/32,
    # which is <= 32 tokens at ANY corpus size (heavy-hitters bound) —
    # the broadcast side never grows. Same lower+\s+ tokenization as the
    # pipeline; empty-doc rows survive via the LEFT JOIN.
    sql["docs_common_token_ratio"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
  FROM documents
),
vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tot AS (SELECT sum(n) AS s FROM vocab),
hh AS (SELECT tok FROM vocab, tot WHERE n * 32 >= s),
per AS (
  SELECT doc_id, count(*) AS n_tokens,
         count(*) FILTER (tok IN (SELECT tok FROM hh)) AS n_common
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_common, 0) AS BIGINT) AS n_common,
       CAST(CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0
                 ELSE (p.n_common * 4096) // p.n_tokens END AS BIGINT)
         AS common_ratio_4096
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY d.doc_id
"""
    # exact corpus length-percentile: rank()-1 = count of strictly
    # shorter docs (ties share the min rank), same \S+ token count as
    # the pipeline's histogram passes
    sql["docs_length_pctile"] = r"""
WITH per AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         rank() OVER (ORDER BY n_tokens) - 1 AS n_less,
         count(*) OVER () AS tot
  FROM per
)
SELECT doc_id, n_tokens, CAST(n_less AS BIGINT) AS n_less,
       CAST((n_less * 4096) // tot AS BIGINT) AS pctile_4096
FROM r ORDER BY doc_id
"""
    # TPC-H Q13 shape: order-count distribution incl. the zero bucket
    sql["orders_count_distribution"] = r"""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust GROUP BY n_orders ORDER BY n_orders
"""
    # TPC-H Q18 shape: HAVING on the fact aggregate, joins up the chain,
    # deterministic top-k (price desc, orderkey asc); integer quantities
    sql["top_customer_orders"] = r"""
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
       total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice_cents DESC, o_orderkey
LIMIT 10
"""
    # the salted join paths must emit byte-identical rows to the unsalted
    # ones — same oracle proves it at the gate
    sql["events_asof_join_salted"] = sql["events_asof_join"]
    sql["events_range_join_salted"] = sql["events_range_join"]
    # prefix filtering has recall 1 BY CONSTRUCTION (the prefix lemma), so
    # the brute-force Jaccard oracle is exact for it with no empirical
    # banding-recall caveat — the same SQL the minhash query matches
    sql["dedup_ngram_jaccard"] = sql["dedup_minhash_lsh"]
    sql["crawl_hits"] = _hits_sql()
    # shared tokenization/pair CTEs for the collocation twins (window=2,
    # sorted pair key so (a,b)/(b,a) collapse on both engines)
    _PAIRS_CTE = r"""
toks AS (
  SELECT list_filter(string_split_regex(lower(text), '\s+'),
                     w -> w <> '') AS ts
  FROM documents
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - d.d),
        i -> CASE WHEN ts[i] <= ts[i + d.d]
                  THEN ts[i] || ' ' || ts[i + d.d]
                  ELSE ts[i + d.d] || ' ' || ts[i] END)) AS pair
  FROM toks, (VALUES (1), (2)) d(d) WHERE len(ts) > d.d
)"""
    sql["docs_cooccur_topk"] = f"""
WITH {_PAIRS_CTE}
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""
    sql["docs_pmi_topk"] = f"""
WITH {_PAIRS_CTE},
cp AS (
  SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b,
         CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
uni AS (SELECT unnest(ts) AS token FROM toks),
uc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_tok FROM uni GROUP BY token),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM uni)
SELECT cp.a || ' ' || cp.b AS pair, cp.n_xy, ua.n_tok AS n_x, ub.n_tok AS n_y,
       CAST((cp.n_xy * n.total * 1000000) // (ua.n_tok * ub.n_tok) AS BIGINT)
         AS pmi_scaled
FROM cp CROSS JOIN n
JOIN uc ua ON ua.token = cp.a
JOIN uc ub ON ub.token = cp.b
ORDER BY pmi_scaled DESC, pair
LIMIT 20
"""
    # CDC latest-wins compaction: latest row per key by (ts, event_id),
    # latest-is-'error' rows are tombstones that delete the key
    sql["events_latest_state"] = """
WITH ranked AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type AS last_type, ts_us AS last_ts_us,
       cents AS last_cents
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""
    # incremental exact dedup: hash_split's affine kernel decides the
    # already-ingested (train) vs new slice; a new doc survives iff its
    # exact text is absent from the old slice
    sql["docs_incremental_dedup"] = f"""
WITH h AS (
  SELECT doc_id, text,
         CAST(((doc_id::HUGEINT * {textops._SPLIT_MUL}
                + {textops._SPLIT_ADD}) % 18446744073709551616)
              // 4503599627370496 AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id FROM h
WHERE bucket >= 3276
  AND text NOT IN (SELECT text FROM h WHERE bucket < 3276)
"""
    # Delta-style MERGE: change set derived deterministically from the
    # base (k%13 delete, else k%7 reprice +1000.00, k%11 spawns an insert
    # under k + 10^9)
    sql["orders_merge_upsert"] = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
chg AS (
  SELECT k, CASE WHEN k % 13 = 0 THEN 'D' ELSE 'U' END AS op,
         cents + 100000 AS new_cents
  FROM base WHERE k % 7 = 0 OR k % 13 = 0
),
merged AS (
  SELECT b.k,
         CASE WHEN c.op = 'U' THEN c.new_cents ELSE b.cents END AS cents,
         CASE WHEN c.op = 'U' THEN 'updated' ELSE 'base' END AS status
  FROM base b LEFT JOIN chg c ON b.k = c.k
  WHERE c.op IS NULL OR c.op <> 'D'
)
SELECT k AS o_orderkey, CAST(cents AS BIGINT) AS price_cents, status
FROM merged
UNION ALL
SELECT k + 1000000000 AS o_orderkey, cents AS price_cents,
       'inserted' AS status
FROM base WHERE k % 11 = 0
"""
    # brute-force containment twin of the minhash/prefix Jaccard oracle:
    # |A∩B| / min(|A|,|B|) over the same distinct 3-shingle sets
    sql["dedup_containment"] = r"""
WITH words AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents),
sh AS (
  SELECT doc_id,
    list_distinct(CASE
      WHEN len(w) = 0 THEN []
      WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      ELSE list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    END) AS sset
  FROM words),
e AS (SELECT doc_id, unnest(sset) AS s FROM sh),
counts AS (SELECT doc_id, len(sset) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b
FROM inter
JOIN counts ca ON ca.doc_id = id_a
JOIN counts cb ON cb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / LEAST(ca.n, cb.n) >= 0.9
"""
    # link targets that are not corpus pages, with distinct-referrer counts
    sql["crawl_dead_links"] = f"""
WITH pages AS (
  SELECT url FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
)
SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_refs
FROM cand
WHERE dst NOT IN (SELECT url FROM pages) AND src <> dst
GROUP BY dst
"""
    # largest-remainder proportional budget allocation over dead-candidate
    # demand: all quantities non-negative so // and % agree across engines
    _budget = inspect.signature(crawl_budget_alloc).parameters[
        "budget"
    ].default
    sql["crawl_budget_alloc"] = f"""
WITH pages AS (
  SELECT url FROM read_parquet('{_SF001_CORPUS}')
),
cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
dead AS (
  SELECT DISTINCT dst FROM cand
  WHERE dst NOT IN (SELECT url FROM pages) AND src <> dst
),
hosts AS (
  SELECT regexp_extract(dst, '^http://([^/]+)', 1) AS host,
         COUNT(*) AS n_urls
  FROM dead GROUP BY 1
),
tot AS (SELECT SUM(n_urls) AS n FROM hosts),
calc AS (
  SELECT host, n_urls,
         ({_budget} * n_urls) // tot.n AS quota,
         ({_budget} * n_urls) % tot.n AS rem
  FROM hosts, tot
),
lr AS (SELECT SUM(quota) AS q FROM calc),
ranked AS (
  SELECT host, n_urls, quota, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk
  FROM calc
)
SELECT host, CAST(n_urls AS BIGINT) AS n_urls,
       CAST(quota + CASE WHEN rk <= {_budget} - (SELECT q FROM lr)
                         THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked
"""
    # Heaps'-law vocabulary growth: vocab at T = tokens whose FIRST
    # occurrence (min doc_id) precedes T — same raw \S+ tokens as
    # docs_vocab_topk
    sql["docs_vocab_growth"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '\S+')))
           AS token
  FROM documents
),
first AS (SELECT token, MIN(doc_id) AS fd FROM toks GROUP BY 1),
t(threshold) AS (VALUES (16), (64), (256), (1024), (4096), (16384),
                        (65536), (262144))
SELECT CAST(threshold AS BIGINT) AS threshold,
       CAST((SELECT COUNT(*) FROM first WHERE fd < threshold) AS BIGINT)
         AS vocab_size
FROM t ORDER BY threshold
"""
    # lang x source mixing cross-tab: observed/expected-under-independence
    # ratio in integer 4096ths (all marginals derive from the cell table)
    sql["docs_lang_source_drift"] = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
l AS (SELECT lang, SUM(n) AS r FROM cells GROUP BY 1),
s AS (SELECT source, SUM(n) AS c FROM cells GROUP BY 1),
t AS (SELECT SUM(n) AS tot FROM cells)
SELECT cells.lang, cells.source, CAST(cells.n AS BIGINT) AS n_docs,
       CAST(t.tot * cells.n * 4096 // (l.r * s.c) AS BIGINT) AS ratio_4096
FROM cells JOIN l USING (lang) JOIN s USING (source) CROSS JOIN t
"""
    # weekly trend: LAG over the week x type domain (delta vs previous
    # OBSERVED week; first week of a type compares to 0)
    sql["events_weekly_trend"] = """
WITH w AS (
  SELECT epoch_us(ts) // 604800000000 AS week, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(week AS BIGINT) AS week, event_type,
       CAST(n AS BIGINT) AS n_events,
       CAST(n - COALESCE(LAG(n) OVER (PARTITION BY event_type
                                      ORDER BY week), 0) AS BIGINT)
         AS wow_delta
FROM w
"""
    # conversion lag histogram: first click -> first purchase per user,
    # hour buckets capped at 48 (the overflow bucket); negative lags
    # (purchase before any click) are non-conversions
    sql["events_conversion_lag"] = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events GROUP BY 1
),
lags AS (
  SELECT LEAST((p - c) // 3600000000, 48) AS lag_bucket
  FROM firsts WHERE c IS NOT NULL AND p IS NOT NULL AND p >= c
)
SELECT CAST(lag_bucket AS BIGINT) AS lag_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM lags GROUP BY 1 ORDER BY 1
"""
    # LTV deciles: distributed NTILE — ranked by (total, user_id), SQL
    # NTILE bucket-size semantics (first n%10 buckets one larger)
    sql["events_user_value_deciles"] = """
WITH t AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
r AS (
  SELECT user_id, total_cents,
         NTILE(10) OVER (ORDER BY total_cents, user_id) AS tile
  FROM t
)
SELECT CAST(tile - 1 AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(total_cents) AS BIGINT) AS min_cents,
       CAST(MAX(total_cents) AS BIGINT) AS max_cents,
       CAST(SUM(total_cents) AS BIGINT) AS sum_cents
FROM r GROUP BY 1
"""
    # URL templates over the distinct candidate set: digit runs -> 'N'
    _tpl_k = inspect.signature(crawl_url_templates).parameters["k"].default
    sql["crawl_url_templates"] = f"""
WITH cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
durls AS (SELECT DISTINCT dst FROM cand WHERE dst <> src)
SELECT regexp_replace(dst, '[0-9]+', 'N', 'g') AS template,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM durls
GROUP BY 1 ORDER BY n_urls DESC, template LIMIT {_tpl_k}
"""
    # hashing-trick vectorizer: dim = md5(token)'s LAST BYTE mod 64,
    # recomputed nibble-exactly from the md5 hex string
    sql["docs_feature_hash"] = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS token
  FROM documents
),
d AS (
  SELECT doc_id,
         ((strpos('0123456789abcdef', substring(md5(token), 31, 1)) - 1) % 4)
            * 16
         + (strpos('0123456789abcdef', substring(md5(token), 32, 1)) - 1)
           AS dim
  FROM toks
)
SELECT doc_id, CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS tf
FROM d GROUP BY doc_id, dim
"""
    # semi-structured extraction: the integer k field of the JSON props
    # column, aggregated per event type (regex twin of the RE2 kernel)
    sql["events_json_extract"] = r"""
WITH ext AS (
  SELECT event_type,
         CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '')
              AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM ext GROUP BY event_type
"""
    # sufficient-statistics OLS, exact integer numerator/denominator pairs
    # (y = whitespace-token count, x = n_chars, per language)
    sql["docs_linreg"] = r"""
WITH feat AS (
  SELECT lang, n_chars AS x,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS y
  FROM documents
),
s AS (
  SELECT lang, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM feat GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(sy * (n * sxx - sx * sx)
            - (n * sxy - sx * sy) * sx AS BIGINT) AS icept_num,
       CAST(n * (n * sxx - sx * sx) AS BIGINT) AS icept_den
FROM s
"""
    # C4-style blocklist scrub: RE2 word-boundary alternation on both
    # engines, so the redacted text is byte-identical
    sql["docs_scrub"] = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\b(?:spark|scan|merge)\b'))
            AS BIGINT) AS n_hits,
       CAST(CASE WHEN length(regexp_extract_all(
                text, '\b(?:spark|scan|merge)\b')) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS keep,
       regexp_replace(text, '\b(?:spark|scan|merge)\b', '[REDACTED]', 'g')
           AS scrubbed
FROM documents
"""
    # sequence-packing manifest: the window cumsum is the SQL twin of the
    # distributed two-pass prefix sum (per-range partials -> broadcast
    # base offsets -> in-partition cumsum)
    sql["docs_pack_manifest"] = r"""
WITH per AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_offset
  FROM per
)
SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // 128 AS BIGINT) AS first_seq,
       CAST((start_offset + greatest(n_tokens, 1) - 1) // 128 AS BIGINT)
           AS last_seq
FROM o ORDER BY doc_id
"""
    # OOV rate vs the corpus's own deterministic top-16 vocabulary
    # (count desc, token asc — the same tie-break as the Ray side)
    sql["docs_oov_rate"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS token
  FROM documents
),
vc AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
vocab AS (SELECT token FROM vc ORDER BY n DESC, token LIMIT 16),
per AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         count(*) FILTER (WHERE v.token IS NULL) AS n_oov
  FROM tok t LEFT JOIN vocab v ON t.token = v.token
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
       CAST(CASE WHEN COALESCE(p.n_tokens, 0) > 0
            THEN (p.n_oov * 4096) // p.n_tokens ELSE 0 END AS BIGINT)
           AS oov_ratio_4096
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
"""
    # DSIR importance weights: md5 bucket recomputed nibble-exactly (the
    # feature_hash trick), per-bucket quantized likelihood ratio in
    # HUGEINT (the Ray side uses arbitrary-precision driver ints)
    sql["docs_dsir_weights"] = r"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> w <> '')) AS token
  FROM documents
),
d AS (
  SELECT doc_id, lang,
         ((strpos('0123456789abcdef', substring(md5(token), 31, 1)) - 1) % 4)
            * 16
         + (strpos('0123456789abcdef', substring(md5(token), 32, 1)) - 1)
           AS dim
  FROM toks
),
c AS (
  SELECT dim, CAST(count(*) AS HUGEINT) AS n_all,
         CAST(count(*) FILTER (WHERE lang = 'en') AS HUGEINT) AS n_tgt
  FROM d GROUP BY dim
),
tot AS (SELECT sum(n_all) AS ta, greatest(sum(n_tgt), 1) AS tt FROM c),
r AS (SELECT dim, (n_tgt * ta * 4096) // (n_all * tt) AS ratio FROM c, tot),
w AS (
  SELECT d.doc_id, count(*) AS n_tokens, sum(r.ratio) AS wgt
  FROM d JOIN r USING (dim) GROUP BY d.doc_id
)
SELECT doc.doc_id,
       CAST(COALESCE(w.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(w.wgt, 0) AS BIGINT) AS dsir_weight
FROM documents doc LEFT JOIN w ON doc.doc_id = w.doc_id
"""
    # corpus-relative bigram fluency: ordered adjacent bigrams per doc,
    # mean corpus frequency (integer floor division on both engines)
    sql["docs_fluency"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     w -> w <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i + 1])) AS gram
  FROM toks WHERE len(ts) > 1
),
gc AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_gram
       FROM grams GROUP BY gram),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(n_gram) AS BIGINT) AS sum_freq
  FROM grams JOIN gc USING (gram) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, sum_freq,
       CAST(sum_freq // n_bigrams AS BIGINT) AS fluency_avg
FROM per
"""
    # deterministic shuffle shards: splitmix64 finalizer mixers in
    # HUGEINT mod 2^64; shard = top 6 bits, in-shard order by the low
    # 52 bits (doc_id tie-break) — constants interpolated from textops
    sql["docs_shuffle_shards"] = f"""
WITH h AS (
  SELECT doc_id,
         ((doc_id::HUGEINT * {textops._SHARD_MUL}
           + {textops._SHARD_ADD}) % 18446744073709551616) AS hv
  FROM documents
)
SELECT doc_id,
       CAST(hv // 288230376151711744 AS BIGINT) AS shard,
       CAST(row_number() OVER (
                PARTITION BY hv // 288230376151711744
                ORDER BY hv % 4503599627370496, doc_id) - 1
            AS BIGINT) AS pos
FROM h
"""
    # CCNet-style per-source boilerplate strip: width-10 segments shared
    # by >= 2 distinct docs of one source are chrome; same ' '-split /
    # rejoin byte contract as docs_segment_dedup
    sql["docs_boilerplate_strip"] = r"""
WITH segs AS (
  SELECT doc_id, source, seg_no,
         array_to_string(ts[seg_no*10+1 : (seg_no+1)*10], ' ') AS seg
  FROM (
    SELECT doc_id, source, ts, unnest(range(0, (len(ts)+9)//10)) AS seg_no
    FROM (SELECT doc_id, source, string_split(text, ' ') AS ts
          FROM documents)
  )
),
b AS (
  SELECT source, seg, count(DISTINCT doc_id) >= 2 AS boiler
  FROM segs GROUP BY source, seg
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(count(*) FILTER (WHERE b.boiler) AS BIGINT) AS n_boiler,
       coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_no)
                FILTER (WHERE NOT b.boiler), '') AS text_clean
FROM segs s JOIN b ON s.source = b.source AND s.seg = b.seg
GROUP BY s.doc_id
"""
    # composed end-to-end prep flagship: scrub keep + exact-dedup winner
    # + min-token filter -> split buckets -> train-survivor shuffle rank
    # (constants interpolated from textops so they cannot drift)
    sql["docs_prepare"] = f"""
WITH base AS (
  SELECT doc_id, text,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
           AS n_tokens,
         length(regexp_extract_all(text, '\\b(?:spark|scan|merge)\\b'))
           AS n_hits
  FROM documents
),
surv AS (
  SELECT b.doc_id FROM base b
  JOIN (SELECT text, min(doc_id) AS keep_id FROM base GROUP BY text) w
    ON b.text = w.text AND b.doc_id = w.keep_id
  WHERE b.n_hits = 0 AND b.n_tokens >= 5
),
h AS (
  SELECT doc_id,
         CASE WHEN ((doc_id::HUGEINT * {textops._SPLIT_MUL}
                     + {textops._SPLIT_ADD}) % 18446744073709551616)
                   // 4503599627370496 < 3276 THEN 'train'
              WHEN ((doc_id::HUGEINT * {textops._SPLIT_MUL}
                     + {textops._SPLIT_ADD}) % 18446744073709551616)
                   // 4503599627370496 < 3686 THEN 'val'
              ELSE 'test' END AS split,
         ((doc_id::HUGEINT * {textops._SHARD_MUL}
           + {textops._SHARD_ADD}) % 18446744073709551616) AS hv
  FROM surv
)
SELECT doc_id, split,
       CAST(CASE WHEN split = 'train' THEN hv // 288230376151711744
                 ELSE -1 END AS BIGINT) AS shard,
       CAST(CASE WHEN split = 'train'
                 THEN row_number() OVER (
                      PARTITION BY CASE WHEN split = 'train'
                                        THEN hv // 288230376151711744
                                        ELSE -1 END
                      ORDER BY hv % 4503599627370496, doc_id) - 1
                 ELSE -1 END AS BIGINT) AS pos
FROM h
"""
    # streaming watermark over the simulated (hash-permuted) arrival
    # order; constants interpolated from analytics so they cannot drift
    sql["events_watermark_late"] = f"""
WITH a AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         ((event_id::HUGEINT * {analytics._ARRIVAL_MUL}
           + {analytics._ARRIVAL_ADD}) % 18446744073709551616) AS hv
  FROM events
),
w AS (
  SELECT event_id, ts_us,
         COALESCE(max(ts_us) OVER (
             ORDER BY hv, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS wm_us
  FROM a
)
SELECT event_id, ts_us, wm_us,
       CAST(ts_us < wm_us - {15 * 86400 * 1_000_000} AS BIGINT) AS late
FROM w
"""
    # PII redaction: both engines AUGMENT the same deterministic contact
    # strings (the synthetic corpus has no PII), then redact with identical
    # RE2 patterns in the same order — the redaction kernel is what the
    # byte-exact comparison checks
    sql["docs_pii_scrub"] = r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact u' || CAST(doc_id AS VARCHAR)
                      || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-123-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                 ELSE '' END AS text
  FROM documents
),
e AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(
             text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS BIGINT) AS n_emails,
         regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '[EMAIL]', 'g') AS t1
  FROM aug
),
p AS (
  SELECT doc_id, n_emails,
         CAST(length(regexp_extract_all(t1, '\b\d{3}-\d{3}-\d{4}\b'))
             AS BIGINT) AS n_phones,
         regexp_replace(t1, '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS t2
  FROM e
)
SELECT doc_id, n_emails, n_phones,
       CAST(length(regexp_extract_all(
           t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
       regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                      '[IP]', 'g') AS redacted
FROM p
"""
    # integer upsample-to-balance source mixing: rep = max_n // n_s
    sql["docs_mix_upsample"] = r"""
WITH n AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
m AS (SELECT MAX(n_s) AS mx FROM n),
r AS (SELECT source, CAST(mx // n_s AS BIGINT) AS rep FROM n, m)
SELECT d.doc_id, d.source,
       unnest(generate_series(0, r.rep - 1)) AS copy, r.rep AS rep
FROM documents d JOIN r USING (source)
"""
    # TPC-H Q22 shape: scalar positive-balance average (exact integers:
    # cents * n > s), anti-join against urgent orders, nation-domain agg
    sql["customers_above_avg_inactive"] = r"""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
s AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM c WHERE cents > 0)
SELECT c_nationkey, COUNT(*) AS n_cust, SUM(cents) AS total_bal_cents
FROM c, s
WHERE c.cents * s.n > s.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""
    # TPC-H Q21 shape: sole returning supplier on a multi-supplier order
    sql["suppliers_sole_returns"] = r"""
WITH ls AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
o AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(has_r) AS n_r
  FROM ls GROUP BY l_orderkey
)
SELECT ls.l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ls JOIN o USING (l_orderkey)
WHERE ls.has_r = 1 AND o.n_supp >= 2 AND o.n_r = 1
GROUP BY ls.l_suppkey
ORDER BY n_orders DESC, ls.l_suppkey
LIMIT 10
"""
    # WAV metadata: every field is closed-form in (doc_id, strlen(text))
    # because audio_payloads builds the RIFF header deterministically —
    # the oracle checks the chunk-walking parser end to end (strlen is
    # DuckDB's BYTE length, matching the utf-8 payload size)
    sql["multimodal_wav_meta"] = r"""
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT) AS sample_rate,
       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
       CAST(16 AS BIGINT) AS bits,
       CAST(strlen(text) AS BIGINT) AS n_data_bytes,
       CAST(strlen(text) // ((1 + doc_id % 2) * 2) AS BIGINT) AS n_frames,
       CAST((strlen(text) // ((1 + doc_id % 2) * 2)) * 1000
            // (CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) AS duration_ms
FROM documents
"""
    # TPC-H Q15 shape: scalar max over an aggregate view, equality
    # join-back keeps ties; revenue exact in centi-cents
    sql["supplier_top_revenue"] = r"""
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS revenue_ccents
  FROM lineitem GROUP BY l_suppkey
),
m AS (SELECT MAX(revenue_ccents) AS mx FROM r)
SELECT s.s_suppkey, s.s_name, r.revenue_ccents
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey, m
WHERE r.revenue_ccents = m.mx
"""
    # TPC-H Q14 shape: conditional aggregate over fact x dim, integer
    # share in 4096ths (no float ratio)
    sql["promo_revenue_share"] = r"""
WITH l AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev,
         p_type
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
s AS (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
              AS BIGINT) AS promo_revenue_ccents,
         CAST(SUM(rev) AS BIGINT) AS total_revenue_ccents
  FROM l
)
SELECT promo_revenue_ccents, total_revenue_ccents,
       CAST(CASE WHEN total_revenue_ccents > 0
            THEN promo_revenue_ccents * 4096 // total_revenue_ccents
            ELSE 0 END AS BIGINT) AS promo_share_4096
FROM s
"""
    # TPC-H Q2 min-cost-supplier shape: argmin-per-group join-back,
    # deterministic tiebreak on suppkey
    sql["part_cheapest_supplier"] = r"""
WITH c AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS cost_ccents
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
w AS (
  SELECT l_partkey, l_suppkey AS best_suppkey, cost_ccents,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY cost_ccents, l_suppkey) AS rn
  FROM c
)
SELECT l_partkey, best_suppkey, cost_ccents FROM w WHERE rn = 1
"""
    # per-group MODE with deterministic tiebreak (count desc, type asc)
    sql["events_mode_type"] = r"""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
w AS (
  SELECT user_id, event_type AS mode_type, n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, mode_type, n FROM w WHERE rn = 1
"""
    # trailing-7-day rolling distinct users: distinct (user, day) pairs
    # exploded to the window-END days each contributes to
    sql["events_wau"] = r"""
WITH p AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
e AS (
  SELECT DISTINCT user_id, day + g.x AS day
  FROM p, (SELECT unnest(generate_series(0, 6)) AS x) g
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM e GROUP BY day
"""
    # bottom-k priority sample: k smallest splitmix64(doc_id) values.
    # Every xor/shift/mulmod of the finalizer is reproduced exactly in
    # nonnegative HUGEINT arithmetic: >> n is // 2^n, multiply mod 2^64
    # splits into 32-bit halves so no intermediate exceeds HUGEINT.
    sql["docs_hash_sample"] = r"""
WITH s0 AS (
  SELECT doc_id,
         (doc_id::HUGEINT + 11400714819323198485)
           % 18446744073709551616 AS z
  FROM documents
),
s1 AS (SELECT doc_id, xor(z, z // 1073741824) AS z FROM s0),
s2 AS (SELECT doc_id,
         (((z % 4294967296) * 13787848793156543929)
            % 18446744073709551616
          + ((((z // 4294967296) * 13787848793156543929) % 4294967296)
             * 4294967296)) % 18446744073709551616 AS z
       FROM s1),
s3 AS (SELECT doc_id, xor(z, z // 134217728) AS z FROM s2),
s4 AS (SELECT doc_id,
         (((z % 4294967296) * 10723151780598845931)
            % 18446744073709551616
          + ((((z // 4294967296) * 10723151780598845931) % 4294967296)
             * 4294967296)) % 18446744073709551616 AS z
       FROM s3),
s5 AS (SELECT doc_id, xor(z, z // 2147483648) AS z FROM s4)
SELECT doc_id, CAST(z // 2 AS BIGINT) AS h63
FROM s5 ORDER BY h63, doc_id LIMIT 64
"""
    # SemDeDup: the kmeans unrolled-CTE twin (bit-exact integer Lloyd)
    # plus an EXISTS over lower-id same-cluster vectors clearing the
    # cosine threshold — min-id representative, no greedy loop needed
    sql["embeddings_semdedup"] = """
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS x
  FROM embeddings
),
c0 AS (SELECT vec_id AS cluster, dim, x AS c FROM v WHERE vec_id < 8),
d1 AS (
  SELECT v.vec_id, c0.cluster,
         SUM((v.x - c0.c) * (v.x - c0.c)) AS dist
  FROM v JOIN c0 USING (dim) GROUP BY v.vec_id, c0.cluster
),
a1 AS (
  SELECT vec_id, CAST(MIN(dist * 8 + cluster) % 8 AS BIGINT) AS cluster
  FROM d1 GROUP BY vec_id
),
s1 AS (
  SELECT a1.cluster, v.dim, CAST(SUM(v.x) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM v JOIN a1 USING (vec_id) GROUP BY a1.cluster, v.dim
),
c1 AS (SELECT cluster, dim, s // n AS c FROM s1),
d2 AS (
  SELECT v.vec_id, c1.cluster,
         SUM((v.x - c1.c) * (v.x - c1.c)) AS dist
  FROM v JOIN c1 USING (dim) GROUP BY v.vec_id, c1.cluster
),
a2 AS (
  SELECT vec_id, CAST(MIN(dist * 8 + cluster) % 8 AS BIGINT) AS cluster
  FROM d2 GROUP BY vec_id
)
SELECT CAST(a.vec_id AS BIGINT) AS vec_id, a.cluster,
  CAST(CASE WHEN EXISTS (
    SELECT 1 FROM a2 b
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
    WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
      AND list_cosine_similarity(ea.embedding, eb.embedding) >= 0.3
  ) THEN 0 ELSE 1 END AS BIGINT) AS keep
FROM a2 a
"""
    # frontier URL blocklist over the dead-links candidate CTE: domain
    # rule = exact host OR dot-suffix, path rule = regex on the path part
    sql["crawl_url_filter"] = f"""
WITH cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
c AS (
  SELECT regexp_extract(dst, '^https?://([^/]+)', 1) AS dst_host,
         (regexp_extract(dst, '^https?://([^/]+)', 1)
            IN ('example.net', 'h2.example.com')
          OR regexp_extract(dst, '^https?://([^/]+)', 1)
             LIKE '%.example.net'
          OR regexp_extract(dst, '^https?://([^/]+)', 1)
             LIKE '%.h2.example.com') AS dom_bad,
         regexp_matches(regexp_replace(dst, '^https?://[^/]*', ''),
                        '/private/') AS path_bad
  FROM cand WHERE src <> dst
)
SELECT dst_host, CAST(COUNT(*) AS BIGINT) AS n_cands,
       CAST(COUNT(*) FILTER (WHERE dom_bad) AS BIGINT) AS n_domain_blocked,
       CAST(COUNT(*) FILTER (WHERE path_bad) AS BIGINT) AS n_path_blocked,
       CAST(COUNT(*) FILTER (WHERE NOT dom_bad AND NOT path_bad) AS BIGINT)
         AS n_allowed
FROM c GROUP BY dst_host
"""
    # quoted-phrase search: adjacency over the shared lowercase \s+ token
    # contract; positions are 0-based on the Ray side, 1-based in SQL lists
    sql["docs_phrase_search"] = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                             w -> w <> '') AS ts
  FROM documents
),
hits AS (
  SELECT doc_id, unnest(list_filter(generate_series(1, len(ts) - 1),
         i -> ts[i] = 'hash' AND ts[i+1] = 'join')) AS pos
  FROM toks
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(MIN(pos) - 1 AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id
"""
    # Q19 shape: OR-of-ANDs bands coupling part and lineitem attributes;
    # revenue in exact integer centi-cents (the mktsegment convention)
    sql["q19_banded_revenue"] = """
WITH p AS (
  SELECT p_partkey, p_brand, p_size FROM part
),
l AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS disc
  FROM lineitem
)
SELECT CAST(COALESCE(SUM(price_cents * (100 - disc)), 0) AS BIGINT)
         AS revenue_ccents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM l JOIN p ON l.l_partkey = p.p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND qty BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND qty BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND qty BETWEEN 20 AND 40)
"""
    sql["crawl_frontier_priority"] = _frontier_priority_sql()
    # resize twin: source dims in closed form (the dims oracle already
    # proves header->parse is an exact inverse), nearest-neighbor source
    # coordinates t*dim//16, stand-in plane (doc_id*31+y*7+x*13)%256
    sql["multimodal_resize"] = """
WITH d AS (
  SELECT doc_id, 16 + (doc_id * 7) % 1000 AS w, 16 + (doc_id * 13) % 800 AS h
  FROM documents
),
g AS (
  SELECT doc_id,
         (doc_id * 31 + ((y.y * h) // 16) * 7 + ((x.x * w) // 16) * 13) % 256
           AS px
  FROM d, range(0, 16) y(y), range(0, 16) x(x)
)
SELECT doc_id, CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
       CAST(SUM(px) AS BIGINT) AS px_sum, CAST(MIN(px) AS BIGINT) AS px_min,
       CAST(MAX(px) AS BIGINT) AS px_max
FROM g GROUP BY doc_id
"""
    # code-vs-prose twin: the shared doc_id-derived snippet augmentation
    # (the pii_scrub device), then the same three counting kernels
    sql["docs_code_score"] = r"""
WITH aug AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
           THEN chr(10) || 'def f' || doc_id || '(x) {' || chr(10)
                || '    return x + ' || doc_id || ';' || chr(10) || '}'
           ELSE '' END AS t
  FROM documents
),
s AS (
  SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
         CAST(length(regexp_extract_all(t, '[{}();=\[\]]')) AS BIGINT)
           AS n_symbols,
         CAST(length(t) - length(replace(t, chr(10) || '    ', ''))
              AS BIGINT) // 5 AS n_indent_lines
  FROM aug
)
SELECT doc_id, n_chars, n_symbols, n_indent_lines,
       4096 * n_symbols // GREATEST(n_chars, 1) AS score_4096,
       CAST(4096 * n_symbols // GREATEST(n_chars, 1) >= 64 AS BIGINT)
         AS is_code
FROM s
"""
    # ---- TPC-H snowflake-join batch (centi-cents = price_cents *
    # (100 - disc_pct); shares in integer 4096ths) ----
    ccents = ("CAST(ROUND(l_extendedprice*100) AS BIGINT)"
              " * (100 - CAST(ROUND(l_discount*100) AS BIGINT))")
    sql["q5_local_supplier_volume"] = f"""
SELECT n_name, SUM({ccents}) AS revenue_ccents
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA' AND EXTRACT(YEAR FROM o_orderdate) = 1997
GROUP BY n_name
"""
    sql["q7_nation_trade_volume"] = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       SUM({ccents}) AS revenue_ccents
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
"""
    sql["q8_market_share"] = f"""
WITH j AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         {ccents} AS ccents,
         CASE WHEN s_nationkey =
              (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
           THEN 1 ELSE 0 END AS is_nat
  FROM lineitem, orders, customer, supplier, part, nation n, region r
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND l_suppkey = s_suppkey AND l_partkey = p_partkey
    AND p_type = 'ECONOMY' AND c_nationkey = n.n_nationkey
    AND n.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
)
SELECT o_year, SUM(ccents * is_nat) AS nation_revenue_ccents,
       SUM(ccents) AS total_revenue_ccents,
       SUM(ccents * is_nat) * 4096 // GREATEST(SUM(ccents), 1) AS share_4096
FROM j GROUP BY o_year
"""
    sql["q9_product_profit"] = f"""
SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       SUM({ccents}
           - CAST(ROUND(p_retailprice*100) AS BIGINT)
             * CAST(l_quantity AS BIGINT) * 100) AS profit_ccents
FROM lineitem, orders, supplier, part, nation
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND l_partkey = p_partkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%widget%'
GROUP BY 1, 2
"""
    sql["q10_returned_revenue"] = f"""
SELECT c_custkey, c_name, n_name, SUM({ccents}) AS revenue_ccents
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY 1, 2, 3
ORDER BY revenue_ccents DESC, c_custkey LIMIT 20
"""
    sql["q4_late_ship_priority"] = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
"""
    sql["q16_supplier_variety"] = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE l_partkey = p_partkey AND p_brand <> 'Brand#5'
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20
"""
    sql["q20_dominant_suppliers"] = """
WITH pairs AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem, part
  WHERE l_partkey = p_partkey AND p_name LIKE '%red%'
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, SUM(qty) AS tq FROM pairs GROUP BY 1),
win AS (
  SELECT p.l_suppkey FROM pairs p JOIN tot t USING (l_partkey)
  WHERE 8 * p.qty > t.tq
)
SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM win JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1, 2
"""
    # ---- webtext analytics batch ----
    sql["crawl_url_depth_hist"] = f"""
WITH cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
urls AS (SELECT DISTINCT dst FROM cand WHERE src <> dst)
SELECT regexp_extract(dst, '^http://([^/]+)', 1) AS host,
       CAST(length(dst) - length(replace(dst, '/', '')) - 2 AS BIGINT)
         AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM urls GROUP BY 1, 2
"""
    sql["docs_ttr"] = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ts FROM documents
)
SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(ts)) AS BIGINT) AS n_types,
       4096 * len(list_distinct(ts)) // GREATEST(len(ts), 1) AS ttr_4096
FROM toks
"""
    sql["docs_readability"] = r"""
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS sy
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sentences, sy AS n_syllables,
       (390 * w * GREATEST(w, 1) + 11800 * sy * GREATEST(s, 1))
         // (GREATEST(s, 1) * GREATEST(w, 1)) - 15590 AS fk_grade_1000
FROM c
"""
    # robots coverage: the '*' group's Disallow prefixes vs the distinct
    # candidate URL set; EXISTS = the pipeline's per-URL multi-rule MAX
    sql["crawl_robots_coverage"] = f"""
WITH cand AS (
  SELECT DISTINCT url AS src,
         CASE WHEN h1 LIKE 'http://%' OR h1 LIKE 'https://%' THEN h1
              ELSE 'http://' || host || h1 END AS dst
  FROM (
    SELECT url, regexp_extract(url, '^http://([^/]+)', 1) AS host,
           split_part(split_part(unnest(string_split(text, chr(10))), '#', 1),
                      '?', 1) AS h1
    FROM read_parquet('{_SF001_CORPUS}')
    WHERE {_HTML_FILTER} AND text <> ''
  )
),
u AS (
  SELECT dst, regexp_extract(dst, '^http://([^/]+)', 1) AS host,
         regexp_replace(dst, '^http://[^/]+', '') AS path
  FROM (SELECT DISTINCT dst FROM cand WHERE src <> dst)
),
r AS (
  -- RE2 has no lookahead: split at 'User-agent:' group boundaries and
  -- keep the groups whose first line is '*'
  SELECT regexp_extract(url, '^http://([^/]+)', 1) AS host,
         trim(x.pfx) AS pfx
  FROM read_parquet('{_SF001_CORPUS}'),
       LATERAL unnest(string_split(text, 'User-agent:')) AS g(grp),
       LATERAL unnest(regexp_extract_all(g.grp, 'Disallow: ([^\\n]+)', 1))
         AS x(pfx)
  WHERE url LIKE '%/robots.txt'
    AND trim(split_part(g.grp, chr(10), 1)) = '*'
    AND trim(x.pfx) <> ''
)
SELECT u.host,
       CAST(SUM(CASE WHEN EXISTS (
         SELECT 1 FROM r WHERE r.host = u.host
           AND starts_with(u.path, r.pfx)) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocked,
       CAST(SUM(CASE WHEN EXISTS (
         SELECT 1 FROM r WHERE r.host = u.host
           AND starts_with(u.path, r.pfx)) THEN 0 ELSE 1 END) AS BIGINT)
         AS n_allowed
FROM u GROUP BY 1
"""
    sql["crawl_host_rank"] = _pagerank_sql(
        host_graph=True,
        final="""SELECT url AS host, CAST(r AS BIGINT) AS rank_scaled FROM r4
ORDER BY rank_scaled DESC, host LIMIT 10""",
    )
    # aHash twin: same closed-form dims/plane as the resize oracle;
    # strict px*256 > sum(px) threshold; bit 63 of each word folds in as
    # the two's-complement sign so BIGINT packing matches int64 exactly
    sql["multimodal_ahash"] = """
WITH d AS (
  SELECT doc_id, 16 + (doc_id * 7) % 1000 AS w, 16 + (doc_id * 13) % 800 AS h
  FROM documents
),
g AS (
  SELECT doc_id, (y.y * 16 + x.x) AS fi,
         (doc_id * 31 + ((y.y * h) // 16) * 7 + ((x.x * w) // 16) * 13) % 256
           AS px
  FROM d, range(0, 16) y(y), range(0, 16) x(x)
),
tot AS (SELECT doc_id, SUM(px) AS s FROM g GROUP BY doc_id),
bits AS (
  SELECT g.doc_id, fi // 64 AS wd, fi % 64 AS j,
         CASE WHEN px * 256 > s THEN 1 ELSE 0 END AS b
  FROM g JOIN tot USING (doc_id)
),
words AS (
  SELECT doc_id, wd,
         CAST(SUM(CASE WHEN j < 63
                       THEN b * (CAST(1 AS BIGINT) << j) ELSE 0 END)
              + MAX(CASE WHEN j = 63 THEN b ELSE 0 END)
                * (-9223372036854775807 - 1) AS BIGINT) AS v
  FROM bits GROUP BY doc_id, wd
)
SELECT doc_id,
       MAX(CASE WHEN wd = 0 THEN v END) AS h0,
       MAX(CASE WHEN wd = 1 THEN v END) AS h1,
       MAX(CASE WHEN wd = 2 THEN v END) AS h2,
       MAX(CASE WHEN wd = 3 THEN v END) AS h3
FROM words GROUP BY doc_id
"""
    sql["events_gap_hist"] = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS tus,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
)
SELECT LEAST((tus - prev) // 60000000, 240) AS gap_minutes,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM o WHERE prev IS NOT NULL
GROUP BY 1
"""
    # integer power-iteration twin: Gram matrix from the quantized
    # vectors, 3 unrolled multiply+truncating-normalize steps in HUGEINT
    # (DuckDB // truncates toward zero; the magnitude form matches the
    # pipeline's Python-int iteration bit for bit)
    step = """
w{k} AS (SELECT g.i, SUM(g.gv * v{p}.v) AS w FROM g
         JOIN v{p} ON g.j = v{p}.i GROUP BY 1),
m{k} AS (SELECT MAX(ABS(w)) AS m FROM w{k}),
v{k} AS (SELECT i, CASE WHEN w < 0 THEN -((-w * 1000) // m)
                        ELSE (w * 1000) // m END AS v FROM w{k}, m{k})"""
    steps = ",".join(step.format(k=k, p=k - 1) for k in range(2, 4))
    sql["embeddings_top_direction"] = f"""
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS v
  FROM embeddings
),
g AS (
  SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.v * b.v) AS HUGEINT) AS gv
  FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2
),
w1 AS (SELECT i, SUM(gv) AS w FROM g GROUP BY i),
m1 AS (SELECT MAX(ABS(w)) AS m FROM w1),
v1 AS (SELECT i, CASE WHEN w < 0 THEN -((-w * 1000) // m)
                      ELSE (w * 1000) // m END AS v FROM w1, m1),
{steps}
SELECT CAST(i AS BIGINT) AS dim, CAST(v AS BIGINT) AS v_scaled FROM v3
"""
    sql["q6_forecast_revenue"] = """
SELECT COALESCE(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * CAST(ROUND(l_discount*100) AS BIGINT)), 0)
         AS revenue_ccents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 4 AND 6
  AND CAST(l_quantity AS BIGINT) < 24
"""
    sql["q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS revenue_ccents
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2
ORDER BY revenue_ccents DESC, l_orderkey LIMIT 10
"""
    sql["q11_important_stock"] = """
WITH pv AS (
  SELECT l_partkey, SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS value_ccents
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey, value_ccents FROM pv
WHERE value_ccents * 1000000 > 1000 * (SELECT SUM(value_ccents) FROM pv)
"""
    sql["orders_price_median"] = """
SELECT o_orderpriority,
       quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5)
         AS median_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1
"""

    # per-column profile of the documents table: value min/max for integer
    # columns, BYTE-length min/max + total byte volume (strlen = bytes in
    # DuckDB) for string columns; n_distinct exact
    sql["docs_profile"] = """
SELECT 'doc_id' AS col, CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(MIN(doc_id) AS BIGINT) AS lo, CAST(MAX(doc_id) AS BIGINT) AS hi,
       CAST(0 AS BIGINT) AS total_len
FROM documents
UNION ALL
SELECT 'text', COUNT(*) - COUNT(text), COUNT(DISTINCT text),
       MIN(strlen(text)), MAX(strlen(text)),
       CAST(COALESCE(SUM(strlen(text)), 0) AS BIGINT)
FROM documents
UNION ALL
SELECT 'lang', COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
       MIN(strlen(lang)), MAX(strlen(lang)),
       CAST(COALESCE(SUM(strlen(lang)), 0) AS BIGINT)
FROM documents
UNION ALL
SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source),
       MIN(strlen(source)), MAX(strlen(source)),
       CAST(COALESCE(SUM(strlen(source)), 0) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
       MIN(n_chars), MAX(n_chars), CAST(0 AS BIGINT)
FROM documents
ORDER BY col
"""

    # symmetric-delete-blocked edit-distance-1 linkage; the oracle is the
    # quadratic scan the Ray plan exists to avoid (fine at gate scale)
    sql["customers_edit1_pairs"] = """
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM (SELECT DISTINCT c_name FROM customer) a
JOIN (SELECT DISTINCT c_name FROM customer) b
  ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
"""
    return sql
