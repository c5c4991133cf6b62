"""Resumable partitioned Parquet sink: one output directory per input
shard, marker-committed, so a failed run re-does only unfinished shards.

The unit of work is an INPUT FRAGMENT (one parquet file of the source
dataset — at 100 TB, one of many thousands). Each shard task reads its
fragment, applies the caller's batch transform, writes
``shard=<i>/part.parquet`` and then commits a ``_SUCCESS`` marker via
atomic rename — so a crash mid-write leaves no marker and the next run
redoes exactly that shard. The driver holds only the fragment list and
per-shard done flags; data never flows through it.

This generalizes the crawl sink's manifest-last rule
(crawl.py:_write_manifest) to any stateless batch transform; the crawl
itself needs the richer manifest because its rounds carry cross-round
frontier state.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

__all__ = ["resumable_transform_write", "read_partitioned",
           "shard_key", "compact_shards", "export_warc"]


def shard_key(path: str) -> str:
    """Stable shard id for an input fragment: basename stem + a short path
    hash (two fragments may share a stem across directories). A STABLE
    function of the path — never of the fragment's position in the file
    list — so growing the input set never renumbers committed shards: the
    old positional keying re-ran every shifted fragment and, on a crash
    mid-re-run, could leave one fragment committed under TWO indices
    (duplicate rows for readers)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    h = hashlib.blake2b(path.encode(), digest_size=5).hexdigest()
    return f"{stem}-{h}"


@ray.remote(num_cpus=1)
def _shard_task(path: str, fn, out_dir: str, shard: str,
                columns: list | None) -> int:
    table = pq.read_table(path, columns=columns)
    out = fn(table) if fn is not None else table
    sdir = os.path.join(out_dir, f"shard={shard}")
    os.makedirs(sdir, exist_ok=True)
    pq.write_table(out, os.path.join(sdir, "part.parquet"))
    tmp = os.path.join(sdir, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        f.write(path)  # marker records provenance for audits
    os.replace(tmp, os.path.join(sdir, "_SUCCESS"))  # commit point
    return out.num_rows


def resumable_transform_write(
    input_glob: str,
    out_dir: str,
    fn=None,
    columns: list | None = None,
    max_in_flight: int = 64,
) -> dict:
    """Apply ``fn`` (pa.Table -> pa.Table, or None for a copy) to every
    input fragment and write one marker-committed output shard per
    fragment. Idempotent: shards whose ``_SUCCESS`` marker exists are
    skipped, so re-running after a crash (or on a grown input set) does
    only the missing work.

    ``max_in_flight`` bounds the submitted-task window (ray.wait
    backpressure) so a million-fragment input never floods the
    scheduler. Returns {"shards", "skipped", "rows"}.

    Shard directories are keyed by ``shard_key(path)`` — a stable function
    of the input path — so growing the input set leaves committed shards
    untouched and runs only the new fragments. The marker still records
    the source path; a mismatch (e.g. a hand-moved shard directory) is
    treated as uncommitted and reprocessed.
    """
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no inputs match {input_glob!r}")
    os.makedirs(out_dir, exist_ok=True)
    pending, skipped = [], 0
    for path in files:
        key = shard_key(path)
        marker = os.path.join(out_dir, f"shard={key}", "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                committed_path = f.read()
            if committed_path == path:
                skipped += 1
                continue
        pending.append((key, path))

    rows, in_flight = 0, []
    for key, path in pending:
        if len(in_flight) >= max_in_flight:
            done, in_flight = ray.wait(in_flight, num_returns=1)
            rows += sum(ray.get(done))
        in_flight.append(_shard_task.remote(path, fn, out_dir, key, columns))
    rows += sum(ray.get(in_flight))
    return {"shards": len(files), "skipped": skipped, "rows": rows}


def read_partitioned(out_dir: str):
    """Ray Dataset over a sink's committed shards (uncommitted shard
    directories — no ``_SUCCESS`` — are excluded)."""
    import ray.data as rd

    parts = [
        os.path.join(d, "part.parquet")
        for d in sorted(glob.glob(os.path.join(out_dir, "shard=*")))
        if os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    return rd.read_parquet(parts)


@ray.remote(num_cpus=1)
def _compact_task(paths: list, out_dir: str, shard: str) -> int:
    out = pa.concat_tables([pq.read_table(p) for p in paths])
    sdir = os.path.join(out_dir, f"shard={shard}")
    os.makedirs(sdir, exist_ok=True)
    pq.write_table(out, os.path.join(sdir, "part.parquet"))
    tmp = os.path.join(sdir, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(paths))
    os.replace(tmp, os.path.join(sdir, "_SUCCESS"))
    return out.num_rows


def compact_shards(
    input_glob: str,
    out_dir: str,
    target_rows: int = 1_000_000,
    max_in_flight: int = 64,
) -> dict:
    """Merge many SMALL parquet fragments into marker-committed shards of
    ~``target_rows`` each — the small-files compaction every long-running
    partitioned sink eventually needs (a 100 TB dataset written by
    thousands of tasks ends up as millions of tiny files; readers then
    pay per-file open/footer costs that dwarf the scan).

    The driver reads only parquet FOOTERS (row counts — O(files)
    metadata, no data), packs fragments greedily in sorted order into
    buckets of >= target_rows, and runs one merge task per bucket with
    the same atomic ``_SUCCESS``-rename commit and ray.wait backpressure
    as :func:`resumable_transform_write`. Buckets are keyed by a stable
    hash of their member paths, so a re-run after a crash redoes only
    uncommitted buckets — and reruns over a GROWN input re-use committed
    buckets whose membership is unchanged. Row order within a shard
    follows the sorted fragment order (deterministic)."""
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no inputs match {input_glob!r}")
    os.makedirs(out_dir, exist_ok=True)

    buckets, cur, cur_rows = [], [], 0
    for path in files:
        cur.append(path)
        cur_rows += pq.read_metadata(path).num_rows
        if cur_rows >= target_rows:
            buckets.append(cur)
            cur, cur_rows = [], 0
    if cur:
        buckets.append(cur)

    pending, skipped = [], 0
    for bucket in buckets:
        key = hashlib.blake2b("\n".join(bucket).encode(),
                              digest_size=6).hexdigest()
        marker = os.path.join(out_dir, f"shard={key}", "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                if f.read() == "\n".join(bucket):
                    skipped += 1
                    continue
        pending.append((key, bucket))

    rows, in_flight = 0, []
    for key, bucket in pending:
        if len(in_flight) >= max_in_flight:
            done, in_flight = ray.wait(in_flight, num_returns=1)
            rows += sum(ray.get(done))
        in_flight.append(_compact_task.remote(bucket, out_dir, key))
    rows += sum(ray.get(in_flight))
    return {"buckets": len(buckets), "skipped": skipped, "rows": rows}


@ray.remote(num_cpus=1)
def _warc_export_task(path: str, out_path: str, columns: list) -> int:
    import pyarrow.compute as pc

    from raycrawl.sources.warc import write_warc

    # honor an explicit mime/content-type column when the corpus carries
    # one — otherwise fall back to the url-suffix map below so reader and
    # writer stay symmetric for every text/* payload the reader routes
    # into the text column (robots, sitemaps, plain .txt pages)
    schema_names = pq.read_schema(path).names
    mime_col = next(
        (c for c in ("mime", "content_type") if c in schema_names), None
    )
    t = pq.read_table(
        path, columns=columns + ([mime_col] if mime_col else [])
    )
    ts = t["warc_ts"]
    if pa.types.is_timestamp(ts.type):
        ts = pc.cast(ts, pa.int64())
    urls = t["url"].to_pylist()
    mimes = t[mime_col].to_pylist() if mime_col else [None] * len(urls)

    def _mime(u: str, m) -> str:
        if m:
            return str(m)
        # suffix map: every payload the reader routes into the text
        # column (mime text/* and != text/html) must round-trip
        p = u.split("?", 1)[0].split("#", 1)[0]
        if p.endswith(("/robots.txt", ".txt")):
            return "text/plain"
        if p.endswith(("/sitemap.xml", "sitemap_index.xml")):
            return "text/xml"
        return "text/html"

    records = (
        {
            "url": u,
            "warc_ts": v or 0,
            "html": h or b"",
            "mime": _mime(u, m),
        }
        for u, v, h, m in zip(
            urls, ts.to_pylist(), t["html"].to_pylist(), mimes
        )
    )
    tmp = out_path + ".tmp"
    n = write_warc(records, tmp, compress=out_path.endswith(".gz"))
    os.replace(tmp, out_path)  # atomic commit — no partial archives
    return n


def export_warc(
    input_glob: str,
    out_dir: str,
    compress: bool = True,
    max_in_flight: int = 64,
) -> dict:
    """Export a parquet corpus (url / warc_ts / html fragments) as WARC
    archives — the interchange format every other web-corpus tool reads.
    One archive per input fragment (the same shard unit the WARC READER
    parallelizes over), written to a temp name and atomically renamed, so
    a re-run after a crash redoes only the missing archives. Shard names
    come from :func:`shard_key` — stable under a grown input set."""
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no inputs match {input_glob!r}")
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    pending, skipped = [], 0
    for path in files:
        out_path = os.path.join(out_dir, shard_key(path) + ext)
        if os.path.exists(out_path):
            skipped += 1
            continue
        pending.append((path, out_path))
    rows, in_flight = 0, []
    cols = ["url", "warc_ts", "html"]
    for path, out_path in pending:
        if len(in_flight) >= max_in_flight:
            done, in_flight = ray.wait(in_flight, num_returns=1)
            rows += sum(ray.get(done))
        in_flight.append(_warc_export_task.remote(path, out_path, cols))
    rows += sum(ray.get(in_flight))
    return {"archives": len(files), "skipped": skipped, "records": rows}
