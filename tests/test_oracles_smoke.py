"""Fast oracle smoke: a few driver-gate comparisons at sf0.001 so query
regressions surface in the normal pytest loop (the full gate is
tools/check_correctness.py at sf0.01)."""

import sys

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SMOKE = ["crawl_edges", "crawl_host_stats", "docs_token_stats",
         "q1_returnflag_agg", "events_topk_users", "docs_exact_dedup",
         "orders_price_quantiles", "docs_top_per_lang", "crawl_pagerank",
         "events_user_running", "lineitem_rollup",
         "customers_without_big_orders", "customers_with_big_orders",
         "events_pivot", "docs_tfidf_topk", "docs_dup_ngrams",
         "small_quantity_revenue", "events_funnel", "crawl_triangles",
         "crawl_components", "docs_postings", "embeddings_label_centroids",
         "events_user_paths", "events_outliers", "events_cohort_retention",
         "nation_customer_supplier_outer", "docs_bigrams_topk",
         "docs_heavy_tokens", "docs_stratified_sample", "lineitem_cube",
         "embeddings_kmeans", "crawl_degree_hist", "events_close_pairs",
         "dedup_ngram_jaccard", "multimodal_dims", "urgent_order_revenue",
         "events_asof_join_salted", "events_range_join_salted",
         "docs_segment_dedup", "docs_common_token_ratio",
         "docs_length_pctile", "orders_count_distribution",
         "top_customer_orders", "docs_bm25_topk", "crawl_host_matrix",
         "docs_cooccur_topk", "docs_pmi_topk", "events_latest_state",
         "docs_incremental_dedup", "orders_merge_upsert",
         "dedup_containment", "crawl_dead_links", "docs_feature_hash",
         "events_json_extract", "docs_linreg", "docs_scrub",
         "docs_pack_manifest", "docs_oov_rate", "docs_dsir_weights",
         "docs_fluency", "docs_shuffle_shards", "docs_boilerplate_strip",
         "docs_prepare", "events_watermark_late", "docs_pii_scrub",
         "docs_mix_upsample", "customers_above_avg_inactive",
         "suppliers_sole_returns", "multimodal_wav_meta",
         "supplier_top_revenue", "promo_revenue_share",
         "part_cheapest_supplier", "events_mode_type", "events_wau",
         "docs_hash_sample", "docs_profile", "customers_edit1_pairs",
         "dedup_source_stats", "ann_quantized_topk", "crawl_budget_alloc",
         "docs_vocab_growth", "docs_lang_source_drift",
         "crawl_url_templates", "events_weekly_trend",
         "events_conversion_lag", "events_user_value_deciles",
         "ann_ivf_index_stats", "orders_price_p90",
         "docs_langid_confusion", "docs_chunks",
         "crawl_recrawl_priority", "crawl_outlink_spam"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SMOKE)
def test_query_matches_oracle(entrymod, con, name):
    result = entrymod.queries()[name](SF)
    ours = result.to_pandas() if not isinstance(result, pd.DataFrame) else result
    sql = entrymod.oracle_sql()[name]
    # crawl oracles hardcode the sf0.01 corpus path (the driver's scale);
    # repoint them at the sf0.001 corpus for this smoke
    sql = sql.replace("/tmp/raycrawl_corpus/sf0.01/", "/tmp/raycrawl_corpus/sf0.001/")
    if "raycrawl_corpus" in sql:
        from raycrawl.pipelines.crawlqueries import corpus_for

        corpus_for(SF)
    theirs = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(_norm(ours), _norm(theirs), check_dtype=False)
