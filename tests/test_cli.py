"""CLI surface tests: crawl --debug parity, synth, and the query runner
(list / head-print / partitioned-Parquet sink). The CLI must reuse — and
never tear down — an already-initialised Ray session."""

import pyarrow.dataset as pads

from raycrawl.cli import main


def test_debug_prints_config_without_crawling(capsys):
    rc = main(["crawl", "http://h0.example.com/", "--corpus", "/nonexistent",
               "--debug"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "debug mode is on: crawling not running" in out
    assert "user agent" in out


def test_query_list(capsys, ray_session):
    rc = main(["query", "list"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "crawl_bfs" in out and "dedup_minhash_lsh" in out


def test_query_unknown(capsys, ray_session):
    assert main(["query", "no_such_query"]) == 2


def test_query_head_and_parquet_sink(capsys, ray_session, tmp_path):
    import ray

    rc = main(["query", "docs_token_stats",
               "--sf-dir", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "docs_token_stats: 500 rows" in out
    assert ray.is_initialized()  # the CLI must not kill the session

    out_dir = str(tmp_path / "q")
    rc = main(["query", "docs_token_stats",
               "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir])
    assert rc == 0
    tbl = pads.dataset(out_dir).to_table()
    assert tbl.num_rows == 500
    assert set(tbl.schema.names) == {"doc_id", "n_tokens", "text_len"}
    assert ray.is_initialized()
