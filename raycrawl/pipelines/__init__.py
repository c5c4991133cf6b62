"""End-to-end Ray Data pipelines (crawl loop, text ops, dedup, ANN)."""
