"""Corpus sources: deterministic synthesis + partitioned Parquet layout."""
