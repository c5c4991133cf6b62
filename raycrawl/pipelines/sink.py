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
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

__all__ = ["resumable_transform_write", "read_partitioned"]


@ray.remote(num_cpus=1)
def _shard_task(path: str, fn, out_dir: str, shard: int,
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

    Shard indices come from the sorted file list, so a GROWN input set can
    shift them (a new file sorting before existing ones renumbers every
    later shard). The marker records its source path exactly for this
    case: a shard whose committed marker names a different source than
    files[i] is treated as uncommitted and reprocessed, so no fragment is
    ever silently skipped and no committed shard keeps rows from the
    wrong source.
    """
    files = sorted(glob.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no inputs match {input_glob!r}")
    os.makedirs(out_dir, exist_ok=True)
    pending, skipped = [], 0
    for i, path in enumerate(files):
        marker = os.path.join(out_dir, f"shard={i}", "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                committed_path = f.read()
            if committed_path == path:
                skipped += 1
                continue
        pending.append((i, path))

    rows, in_flight = 0, []
    for i, path in pending:
        if len(in_flight) >= max_in_flight:
            done, in_flight = ray.wait(in_flight, num_returns=1)
            rows += sum(ray.get(done))
        in_flight.append(_shard_task.remote(path, fn, out_dir, i, columns))
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
