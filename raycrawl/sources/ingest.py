"""Source-format ingestion: bring a JSONL / CSV / Parquet crawl archive
into the host-bucketed Parquet layout the engine fetches from.

``generate_corpus`` (synth.py) writes ``corpus/bucket=<b>/part-*.parquet``;
real users arrive with Common-Crawl-style JSONL (one record per page) or a
CSV/Parquet export. ``ingest_corpus`` normalizes any of those to
:func:`raycrawl.sources.synth.corpus_schema` and lays it out hive-
partitioned by the same ``host_bucket`` hash — after which every pipeline
(crawl, analytics, conformance) runs unchanged on the ingested data.

Scale shape: ONE streaming pass — read (format by extension) →
vectorized normalize + per-unique-host bucket assignment (the blake2b
host hash runs once per distinct host per batch, not per row) →
distributed hive-partitioned write. Nothing lands on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from raycrawl.sources.synth import (
    N_BUCKETS_DEFAULT,
    corpus_schema,
    host_bucket,
)

__all__ = ["read_table", "ingest_corpus"]

_READERS = {
    ".parquet": rd.read_parquet,
    ".csv": rd.read_csv,
    ".json": rd.read_json,
    ".jsonl": rd.read_json,
}


def _format_of(path: str) -> str:
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            if entry.endswith((".warc", ".warc.gz")):
                return ".warc"
            ext = os.path.splitext(entry)[1]
            if ext in _READERS:
                return ext
        raise ValueError(
            f"no supported files (.parquet/.csv/.jsonl/.warc) in {path!r}"
        )
    if path.endswith((".warc", ".warc.gz")):
        return ".warc"
    ext = os.path.splitext(path)[1]
    if ext not in _READERS:
        raise ValueError(f"unsupported source format {ext!r} for {path!r}")
    return ext


def read_table(path: str, columns=None) -> rd.Dataset:
    """Dataset over ``path`` with the format picked by extension.
    Column pruning is pushed into the read for Parquet (row groups never
    leave storage); CSV/JSON prune right after parse (those formats are
    row-oriented on disk — there is nothing to push down)."""
    ext = _format_of(path)
    if ext == ".parquet":
        return rd.read_parquet(path, columns=columns)
    if ext == ".warc":
        from raycrawl.sources.warc import read_warc

        ds = read_warc(path)
    else:
        ds = _READERS[ext](path)
    return ds.select_columns(columns) if columns else ds


_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?P<host>[^/?#]*)"


def ingest_corpus(
    input_path: str,
    out_dir: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> dict:
    """Normalize a crawl archive into ``out_dir/corpus/bucket=<b>/``.

    Accepted record fields: ``url`` (required), ``html`` (string or
    binary; absent → empty), ``text`` (absent → ""), ``lang`` (absent →
    ""), ``warc_ts`` (timestamp or epoch-microsecond int; absent → 0).
    Returns {"corpus": <dir>, "n_rows": int, "n_buckets": int}.
    """
    schema = corpus_schema()

    def normalize(t: pa.Table) -> pa.Table:
        n = len(t)
        names = set(t.column_names)

        def col(name, default_arr, cast=None):
            if name not in names:
                return default_arr
            c = t[name]
            return pc.cast(c, cast) if cast is not None else c

        urls = pc.cast(t["url"], pa.string())
        if "html" in names:
            # JSONL carries html as a utf-8 string; parquet as binary
            html = pc.fill_null(pc.cast(t["html"], pa.binary()), b"")
        else:
            html = pa.array([b""] * n, pa.binary())
        text = pc.fill_null(col("text", pa.array([""] * n), pa.string()), "")
        lang = pc.fill_null(col("lang", pa.array([""] * n), pa.string()), "")
        if "warc_ts" in names:
            # epoch-us ints and native timestamps both cast cleanly
            ts = pc.fill_null(
                pc.cast(t["warc_ts"], pa.timestamp("us")),
                pa.scalar(0, pa.timestamp("us")),
            )
        else:
            ts = pa.array(np.zeros(n, np.int64)).cast(pa.timestamp("us"))

        hosts = pc.fill_null(
            pc.struct_field(pc.extract_regex(urls, _HOST_RE), "host"), ""
        ).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(hosts, return_inverse=True)
        per_uniq = np.array(
            [host_bucket(h, n_buckets) for h in uniq], np.int64
        )  # blake2b once per DISTINCT host, not per row
        bucket = per_uniq[inv]

        out = pa.table(
            {
                "url": urls,
                "warc_ts": ts,
                "html": html,
                "text": text,
                "lang": lang,
                "bucket": pa.array(bucket, pa.int64()),
            }
        )
        return out.cast(
            pa.schema(list(schema) + [pa.field("bucket", pa.int64())])
        )

    corpus_dir = os.path.join(out_dir, "corpus")
    ds = read_table(input_path).map_batches(normalize, batch_format="pyarrow")
    ds.write_parquet(corpus_dir, partition_cols=["bucket"])

    import pyarrow.dataset as pads  # count from parquet metadata only

    n_rows = pads.dataset(corpus_dir, partitioning="hive").count_rows()
    return {"corpus": corpus_dir, "n_rows": n_rows, "n_buckets": n_buckets}
