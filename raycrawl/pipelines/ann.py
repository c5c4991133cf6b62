"""Similarity search over an embedding column (training-data pipeline).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch scores a dense numpy matmul against it;
per-batch top-k partials are then merged in one tiny driver-side reduction
(k x n_queries rows). Scale path (round 5): PERSISTED, PARTITIONED
indexes — IVF vectors live hive-partitioned by their exact-integer
k-means list, LSH vectors replicated into per-(table, bucket) dirs; a
probe reads ONLY the partitions its queries assign/hash to, so the
index prunes I/O, not just arithmetic. Builds are marker-committed per
input fragment and resumable; see the index section below.
"""

from __future__ import annotations

import os

import numpy as np

import pyarrow as pa
import ray
import ray.data as rd

__all__ = [
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "lsh_build_index",
    "ivf_build_index",
    "ivf_index_stats",
    "label_centroids",
    "kmeans_assign",
    "power_iteration",
    "quantized_topk",
]


def label_centroids(sf_dir: str, scale: int = 1_000_000,
                    ds: rd.Dataset | None = None) -> rd.Dataset:
    """(label, dim, sum_scaled, n_vecs): per-label embedding centroid
    numerators, melted to one row per (label, dimension) — the vector
    aggregate a clustering / class-prototype stage needs (centroid =
    sum/n; the division is left to the caller so the result stays
    integer-exact).

    Values are fixed-point ints: floor(float64(v) * scale) — float32 ->
    float64 is exact and float64 multiply + floor are bit-identical in
    numpy and SQL, so a DuckDB oracle reproduces every sum. Per batch,
    the list column is ONE zero-copy flatten + reshape (no per-row
    python), per-label partial sums via np.add.at; the shuffle then moves
    |labels| x dim partial rows per batch, never the vectors."""
    from ray.data.aggregate import Sum

    _EMPTY_PARTIAL = pa.schema(
        [("label", pa.int64()), ("dim", pa.int64()),
         ("sum_scaled", pa.int64()), ("n_vecs", pa.int64())]
    ).empty_table()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # Ray Data can deliver empty blocks; d would come out 0 and the
            # reshape(-1, 0) below raises — emit the typed empty partial
            return _EMPTY_PARTIAL
        emb = t["embedding"].combine_chunks()
        m = emb.flatten().to_numpy(zero_copy_only=False)
        d = len(m) // max(len(t), 1)
        m = m.reshape(-1, d).astype(np.float64)
        ints = np.floor(m * scale).astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, ints)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1), len(uniq)),
                                pa.int64()),
                "sum_scaled": pa.array(sums.ravel(), pa.int64()),
                "n_vecs": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    if ds is None:
        ds = rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["label", "embedding"],
        )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(
            Sum("sum_scaled", alias_name="sum_scaled"),
            Sum("n_vecs", alias_name="n_vecs"),
        )
    )


def _scaled_batch(t: pa.Table, scale: int) -> np.ndarray:
    """Fixed-point int64 matrix from the batch's list column (one
    zero-copy flatten + reshape; floor(float64 * scale) is the
    DuckDB-reproducible quantization shared with label_centroids)."""
    emb = t["embedding"].combine_chunks()
    m = emb.flatten().to_numpy(zero_copy_only=False)
    d = len(m) // max(len(t), 1)
    return np.floor(m.reshape(-1, d).astype(np.float64) * scale).astype(
        np.int64
    )


def _assign(x: np.ndarray, cids: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid per row in EXACT int64 squared-L2; ties go to the
    smallest cluster id (cents rows are sorted by cid, argmin picks the
    first minimum — the SQL twin's min(dist*k+cid) % k)."""
    dist = (
        (x * x).sum(1, keepdims=True)
        - 2 * (x @ cents.T)
        + (cents * cents).sum(1)[None, :]
    )
    return cids[np.argmin(dist, axis=1)]


def _train_centroids(
    sf_dir: str, k: int, scale: int, ds: rd.Dataset,
) -> tuple[np.ndarray, np.ndarray]:
    """Round-1 of the exact-integer 2-round Lloyd k-means: returns the
    ROUND-2 centroid table (cluster ids, int64 centroid matrix) that
    :func:`kmeans_assign` assigns against — shared by the IVF index build
    so the persisted list assignment is bit-identical to the
    ``embeddings_kmeans`` unrolled-CTE oracle. Deterministic init (vec_id
    < k seed rows); empty round-1 clusters are dropped."""
    import pyarrow.parquet as pq_  # driver-side: k seed rows only

    seed = pq_.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    cids = seed["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = _scaled_batch(seed, scale)
    cent_ref = ray.put((cids, cents))

    _EMPTY_PART = pa.schema(
        [("cluster", pa.int64()), ("dim", pa.int64()),
         ("s", pa.int64()), ("n", pa.int64())]
    ).empty_table()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block: reshape(-1, 0) would raise
            return _EMPTY_PART
        c_ids, c = ray.get(cent_ref)
        x = _scaled_batch(t, scale)
        a = _assign(x, c_ids, c)
        uniq, inv = np.unique(a, return_inverse=True)
        d = x.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, x)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d), len(uniq)), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    # round 1: fold the <= k x d x n_batches melted partials driver-side
    parts = [
        p
        for p in ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if p.num_rows
    ]
    merged = (
        pa.concat_tables(parts)
        .group_by(["cluster", "dim"])
        .aggregate([("s", "sum"), ("n", "sum")])
        .sort_by([("cluster", "ascending"), ("dim", "ascending")])
    )
    d = cents.shape[1]
    new_ids = np.unique(merged["cluster"].to_numpy(zero_copy_only=False))
    s = merged["s_sum"].to_numpy(zero_copy_only=False).reshape(len(new_ids), d)
    n = merged["n_sum"].to_numpy(zero_copy_only=False).reshape(len(new_ids), d)
    new_cents = np.sign(s) * (np.abs(s) // n)  # SQL-truncating int mean
    return new_ids.astype(np.int64), new_cents.astype(np.int64)


def kmeans_assign(
    sf_dir: str, k: int = 8, scale: int = 1_000_000,
    ds: rd.Dataset | None = None, with_embedding: bool = False,
) -> rd.Dataset:
    """(vec_id, cluster): two-round Lloyd k-means over the embedding
    table, EXACT in integers end to end so a DuckDB twin reproduces every
    assignment bit-for-bit (the PageRank unrolled-iteration trick applied
    to an iterative ML kernel): vectors quantize to fixed-point int64,
    distances are exact int64 squared-L2, the argmin tie-breaks to the
    lowest cluster id, and the centroid update is the TRUNCATED integer
    mean sign(s)*(|s|//n) — matching SQL's truncating `//`. Deterministic
    init: the vectors with vec_id < k. Clusters that come out empty after
    round 1 are dropped (the SQL join does the same).

    Scale shape: each round is ONE streaming pass — centroids ride along
    as a ray.put broadcast (k x d int64), each batch does a dense int64
    matmul and emits a k x d melted partial (sums + counts), and the
    driver folds the tiny partials; vectors never shuffle. The final
    round emits assignments instead of partials. Rounds are fixed (2) —
    convergence-to-fixpoint k-means just repeats the same pass.
    """
    if ds is None:
        ds = rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )

    new_ids, new_cents = _train_centroids(sf_dir, k, scale, ds)
    cent2_ref = ray.put((new_ids, new_cents))

    def assign_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block: reshape(-1, 0) would raise
            fields = [("vec_id", pa.int64()), ("cluster", pa.int64())]
            if with_embedding:
                fields.append(
                    ("embedding", t.schema.field("embedding").type))
            return pa.schema(fields).empty_table()
        c_ids, c = ray.get(cent2_ref)
        a = _assign(_scaled_batch(t, scale), c_ids, c)
        cols = {
            "vec_id": t["vec_id"],
            "cluster": pa.array(a, pa.int64()),
        }
        if with_embedding:  # downstream per-cluster passes (semdedup)
            cols["embedding"] = t["embedding"]
        return pa.table(cols)

    return ds.map_batches(assign_only, batch_format="pyarrow")


def _load_queries(sf_dir: str, n_queries: int):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    mask = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False) < n_queries)
    sub = t.filter(pa.array(mask))
    ids = sub["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.stack(sub["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], _normalize(m[order])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def brute_force_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pa.Table:
    """(query_id, rank, vec_id): cosine top-k per query, self-hit excluded.

    Ties break by (-sim, vec_id) — deterministic. Partial top-k per batch
    (k rows per query per batch) -> merge on the driver: the reduction is
    O(batches * k * n_queries), never O(n_vectors).
    """
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q_mat))

    def score(t: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(q_ref)  # object-store read, worker-cached
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
        sims = q_mat @ m.T  # (n_queries, batch)
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])  # +1: self-hit may be in-batch
        for qi, qid in enumerate(q_ids):
            row = sims[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            for j in idx:
                if ids[j] == qid:
                    continue
                out_q.append(qid)
                out_v.append(ids[j])
                out_s.append(row[j])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    merged = (
        partials.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    merged["rank"] = merged.groupby("query_id").cumcount() + 1
    out = merged[["query_id", "rank", "vec_id"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()), ("vec_id", pa.int64())]
        )
    )


# --------------------------------------------------------------------------
# Materialized, partitioned ANN indexes (round 5).
#
# The round-4 LSH/IVF implementations re-read and re-signed/re-assigned the
# FULL embedding table on every query wave and pruned only the scoring
# matmul — at 100 TB an ANN index must prune I/O, not arithmetic. These
# variants build a persisted hive-partitioned Parquet layout ONCE
# (marker-committed per input fragment, resumable like pipelines/sink.py;
# a meta file written last is the index commit point) and every probe
# reads ONLY the partitions its queries hash/assign to:
#
#   ivf: index_dir/list=<cluster>/<shard>.parquet   — one dir per IVF list,
#        assignment = the exact-integer 2-round Lloyd k-means shared with
#        kmeans_assign, so the persisted list assignment has a bit-exact
#        DuckDB twin (the embeddings_kmeans unrolled CTE — ivf_index_stats
#        is the oracle-backed audit query over the index files themselves).
#   lsh: index_dir/t=<table>/b=<bucket>/<shard>.parquet — the classic
#        multi-table layout: each vector is REPLICATED into its bucket in
#        every hash table (n_tables x storage — the standard LSH trade for
#        sub-linear probes; on clustered real-world embeddings fewer,
#        deeper tables shrink both the replication and the probe set).
#
# Probes return (result, stats) when return_stats=True; stats carry the
# exact file lists read vs present so callers (and the driver-facing
# recall-checked wrappers) can ASSERT the probe touched only probed
# partitions.
# --------------------------------------------------------------------------

_INDEX_ROOT = os.environ.get("RAYCRAWL_ANN_INDEX_DIR",
                             "/tmp/raycrawl_ann_index")


def _corpus_stamp(sf_dir: str) -> str:
    p = os.path.abspath(os.path.join(sf_dir, "embeddings.parquet"))
    st = os.stat(p)
    return f"{p}:{st.st_size}:{int(st.st_mtime)}"


def _index_home(sf_dir: str, kind: str, params: dict) -> str:
    """Cache directory keyed by corpus identity + build params, so a
    changed corpus or parameter set NEVER reuses a stale index."""
    import hashlib
    import json as _json

    fp = hashlib.blake2b(
        (_corpus_stamp(sf_dir) + _json.dumps(params, sort_keys=True)).encode(),
        digest_size=8,
    ).hexdigest()
    return os.path.join(_INDEX_ROOT, f"{kind}-{fp}")


def _index_ready(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, "_META.json"))


def _commit_meta(index_dir: str, meta: dict) -> None:
    import json as _json

    tmp = os.path.join(index_dir, "_META.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, "_META.json"))  # commit point


def _fragment_pending(index_dir: str, path: str, shard: str) -> bool:
    marker = os.path.join(index_dir, "_markers", shard)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == path:
                return False
    return True


def _commit_fragment(index_dir: str, path: str, shard: str) -> None:
    mdir = os.path.join(index_dir, "_markers")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, shard + ".tmp")
    with open(tmp, "w") as f:
        f.write(path)  # provenance; mismatch => fragment re-runs
    os.replace(tmp, os.path.join(mdir, shard))


def _raw_queries(sf_dir: str, n_queries: int):
    """(ids, raw float64 matrix) for vec_id < n_queries — UNnormalized,
    for the integer probe-list selection that must match the stored
    k-means assignment metric exactly."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    ).sort_by("vec_id")
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, np.stack(t["embedding"].to_pylist()).astype(np.float64)


def _merge_topk(partials, k: int, dedup: bool = False) -> pa.Table:
    """Driver-side merge of per-batch top-k partials — O(batches * k *
    n_queries) rows, never O(n_vectors). ``dedup`` drops replica hits
    (the LSH layout stores a vector once per table; scores are identical
    across replicas so keep-first after the deterministic sort is exact)."""
    merged = partials.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    )
    if dedup:
        merged = merged.drop_duplicates(["query_id", "vec_id"])
    merged = merged.groupby("query_id", as_index=False).head(k)
    merged["rank"] = merged.groupby("query_id").cumcount() + 1
    out = merged[["query_id", "rank", "vec_id"]].reset_index(drop=True)
    import pandas as pd  # local: partials already a DataFrame

    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()),
             ("vec_id", pa.int64())]
        )
    )


# ---------------------------- IVF index -----------------------------------


@ray.remote(num_cpus=1)
def _ivf_build_task(path: str, index_dir: str, shard: str,
                    cent_ref, scale: int) -> int:
    """Index one input fragment: assign every vector to its list with the
    broadcast centroid table, split the fragment BY LIST and append one
    parquet file per (list, fragment). Idempotent: a crashed rerun
    rewrites the same filenames before committing the fragment marker."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(path, columns=["vec_id", "embedding"])
    cids, cents = cent_ref  # top-level ObjectRef arg: Ray pre-resolves it
    a = _assign(_scaled_batch(t, scale), cids, cents)
    t = t.append_column("list_id", pa.array(a, pa.int64()))
    for c in np.unique(a):
        sub = t.filter(pa.array(a == c))
        d = os.path.join(index_dir, f"list={int(c)}")
        os.makedirs(d, exist_ok=True)
        pq_.write_table(sub, os.path.join(d, f"{shard}.parquet"))
    _commit_fragment(index_dir, path, shard)
    return t.num_rows


def ivf_build_index(
    sf_dir: str, n_lists: int = 8, scale: int = 1_000_000,
    index_dir: str | None = None, max_in_flight: int = 64,
) -> str:
    """Build (or resume building) the persisted IVF index; returns its
    directory. Centroids train in ONE distributed pass (k x d melted
    partials — vectors never reach the driver), then one task per input
    fragment writes its rows split by list. The centroid table persists
    beside the lists so probes never retrain; _META.json last = commit."""
    from glob import glob as _glob

    if index_dir is None:
        index_dir = _index_home(
            sf_dir, "ivf", {"n_lists": n_lists, "scale": scale}
        )
    if _index_ready(index_dir):
        return index_dir
    os.makedirs(index_dir, exist_ok=True)

    files = sorted(
        _glob(os.path.join(sf_dir, "embeddings*.parquet"))
    )
    ds = rd.read_parquet(files, columns=["vec_id", "embedding"])
    cids, cents = _train_centroids(sf_dir, n_lists, scale, ds)
    cent_ref = ray.put((cids, cents))

    in_flight = []
    for path in files:
        shard = _shard_name(path)
        if not _fragment_pending(index_dir, path, shard):
            continue
        if len(in_flight) >= max_in_flight:
            _, in_flight = ray.wait(in_flight, num_returns=1)
        in_flight.append(
            _ivf_build_task.remote(path, index_dir, shard, cent_ref, scale)
        )
    ray.get(in_flight)

    # persist the centroid table (melted — same layout the oracle CTE uses)
    import pyarrow.parquet as pq_

    d = cents.shape[1]
    pq_.write_table(
        pa.table(
            {
                "cluster": pa.array(np.repeat(cids, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d), len(cids)), pa.int64()),
                "c": pa.array(cents.ravel(), pa.int64()),
            }
        ),
        os.path.join(index_dir, "_centroids.parquet"),
    )
    _commit_meta(
        index_dir,
        {"kind": "ivf", "n_lists": n_lists, "scale": scale,
         "n_fragments": len(files), "stamp": _corpus_stamp(sf_dir)},
    )
    return index_dir


def _shard_name(path: str) -> str:
    import hashlib

    stem = os.path.splitext(os.path.basename(path))[0]
    return f"{stem}-{hashlib.blake2b(path.encode(), digest_size=5).hexdigest()}"


def _load_centroids(index_dir: str):
    import pyarrow.parquet as pq_

    t = pq_.read_table(os.path.join(index_dir, "_centroids.parquet"))
    cids = np.unique(t["cluster"].to_numpy(zero_copy_only=False))
    d = t.num_rows // max(len(cids), 1)
    c = (
        t.sort_by([("cluster", "ascending"), ("dim", "ascending")])["c"]
        .to_numpy(zero_copy_only=False)
        .reshape(len(cids), d)
    )
    return cids.astype(np.int64), c.astype(np.int64)


def ivf_topk(
    sf_dir: str, n_queries: int = 5, k: int = 10,
    n_lists: int = 8, n_probe: int = 7, scale: int = 1_000_000,
    index_dir: str | None = None, return_stats: bool = False,
):
    """Approximate top-k probing a PERSISTED IVF index — the scale path.

    The index (built once, cached, resumable) stores vectors physically
    partitioned by their k-means list; a probe assigns each query to its
    ``n_probe`` nearest lists in the SAME exact-integer metric the index
    was built with and reads ONLY those ``list=<c>/`` partitions — I/O
    pruning, not just matmul pruning. Scoring stays float cosine with the
    brute-force tie rule ((-sim, vec_id)); recall vs brute force is
    asserted by the driver-facing wrapper (probing 7 of 8 lists measures
    ~0.95 recall on the no-cluster-structure synthetic embeddings, where
    recall tracks the scanned fraction; clustered real embeddings reach
    the same recall at a far smaller probe fraction).
    """
    from glob import glob as _glob

    if index_dir is None:
        index_dir = ivf_build_index(sf_dir, n_lists, scale)
    cids, cents = _load_centroids(index_dir)

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    _, q_raw = _raw_queries(sf_dir, n_queries)
    x = np.floor(q_raw * scale).astype(np.int64)
    dist = (
        (x * x).sum(1, keepdims=True)
        - 2 * (x @ cents.T)
        + (cents * cents).sum(1)[None, :]
    )
    # n_probe nearest lists per query, ties to the smaller cluster id
    q_lists = np.empty((len(q_ids), min(n_probe, len(cids))), np.int64)
    for qi in range(len(q_ids)):
        order = np.lexsort((cids, dist[qi]))
        q_lists[qi] = cids[order[: q_lists.shape[1]]]

    probed = sorted({int(c) for row in q_lists for c in row})
    files = []
    for c in probed:
        files += sorted(_glob(os.path.join(index_dir, f"list={c}", "*.parquet")))
    all_files = sorted(
        _glob(os.path.join(index_dir, "list=*", "*.parquet"))
    )
    q_ref = ray.put((q_ids, q_mat, q_lists))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("query_id", pa.int64()), ("vec_id", pa.int64()),
                 ("sim", pa.float64())]
            ).empty_table()
        q_ids, q_mat, q_lists = ray.get(q_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = t["list_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            cand = np.isin(lists, q_lists[qi]) & (ids != qid)
            if not cand.any():
                continue
            row = q_mat[qi] @ m[cand].T
            cvids = ids[cand]
            kk = min(k, len(cvids))
            sel = np.argpartition(-row, kk - 1)[:kk]
            out_q += [qid] * len(sel)
            out_v += cvids[sel].tolist()
            out_s += row[sel].tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        rd.read_parquet(files, columns=["vec_id", "list_id", "embedding"])
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out = _merge_topk(partials, k)
    if return_stats:
        return out, {
            "files_read": files,
            "files_total": len(all_files),
            "lists_probed": probed,
            "n_lists": len(cids),
            "index_dir": index_dir,
        }
    return out


def ivf_index_stats(
    sf_dir: str, n_lists: int = 8, scale: int = 1_000_000,
    index_dir: str | None = None,
) -> rd.Dataset:
    """(list_id, n_vecs, min_vec_id, max_vec_id, sum_vec_id): per-list
    audit of the PERSISTED IVF index, computed from the index files
    themselves — the oracle-backed proof that the physical layout's list
    assignment is bit-identical to the exact-integer k-means the
    ``embeddings_kmeans`` unrolled CTE reproduces (reference for the
    pattern: the kmeans_assign twin above). List-domain-bounded native
    aggregate: one partial row per (block, list)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    if index_dir is None:
        index_dir = ivf_build_index(sf_dir, n_lists, scale)
    from glob import glob as _glob

    files = sorted(_glob(os.path.join(index_dir, "list=*", "*.parquet")))
    return (
        rd.read_parquet(files, columns=["vec_id", "list_id"])
        .groupby("list_id")
        .aggregate(
            Count(alias_name="n_vecs"),
            Min("vec_id", alias_name="min_vec_id"),
            Max("vec_id", alias_name="max_vec_id"),
            Sum("vec_id", alias_name="sum_vec_id"),
        )
    )


# ---------------------------- LSH index -----------------------------------


def _lsh_planes(n_tables: int, n_planes: int, dim: int, seed: int):
    return np.random.RandomState(seed).randn(n_tables, n_planes, dim)


def _lsh_signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n_tables, n_rows) int bucket ids from sign patterns."""
    n_tables, n_planes, _ = planes.shape
    sigs = np.empty((n_tables, m.shape[0]), dtype=np.int64)
    pows = (1 << np.arange(n_planes)).astype(np.int64)
    for t_i in range(n_tables):
        bits = (m @ planes[t_i].T) > 0
        sigs[t_i] = bits.astype(np.int64) @ pows
    return sigs


@ray.remote(num_cpus=1)
def _lsh_build_task(path: str, index_dir: str, shard: str,
                    planes_ref, n_planes: int) -> int:
    """Index one fragment: signature per table, rows replicated into
    their bucket dir per table (t=<i>/b=<sig>/), marker-committed."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(path, columns=["vec_id", "embedding"])
    planes = planes_ref  # top-level ObjectRef arg: Ray pre-resolves it
    m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
    sigs = _lsh_signatures(m, planes)
    n_buckets = 1 << n_planes
    for t_i in range(planes.shape[0]):
        row_sigs = sigs[t_i]
        for b in np.unique(row_sigs):
            sub = t.filter(pa.array(row_sigs == b))
            sub = sub.append_column(
                "tb_key",
                pa.array(
                    np.full(sub.num_rows, t_i * n_buckets + int(b), np.int64),
                    pa.int64(),
                ),
            )
            d = os.path.join(index_dir, f"t={t_i}", f"b={int(b)}")
            os.makedirs(d, exist_ok=True)
            pq_.write_table(sub, os.path.join(d, f"{shard}.parquet"))
    _commit_fragment(index_dir, path, shard)
    return t.num_rows


def lsh_build_index(
    sf_dir: str, n_planes: int = 4, n_tables: int = 24, seed: int = 13,
    index_dir: str | None = None, max_in_flight: int = 64,
) -> str:
    """Build (or resume) the persisted multi-table LSH index; returns its
    directory. Plane matrices are a deterministic function of (seed,
    dims), so probes regenerate them instead of loading them."""
    from glob import glob as _glob

    if index_dir is None:
        index_dir = _index_home(
            sf_dir, "lsh",
            {"n_planes": n_planes, "n_tables": n_tables, "seed": seed},
        )
    if _index_ready(index_dir):
        return index_dir
    os.makedirs(index_dir, exist_ok=True)

    files = sorted(_glob(os.path.join(sf_dir, "embeddings*.parquet")))
    import pyarrow.parquet as pq_

    dim = len(
        pq_.read_table(files[0], columns=["embedding"])
        .slice(0, 1)["embedding"][0]
    )
    planes_ref = ray.put(_lsh_planes(n_tables, n_planes, dim, seed))

    in_flight = []
    for path in files:
        shard = _shard_name(path)
        if not _fragment_pending(index_dir, path, shard):
            continue
        if len(in_flight) >= max_in_flight:
            _, in_flight = ray.wait(in_flight, num_returns=1)
        in_flight.append(
            _lsh_build_task.remote(path, index_dir, shard, planes_ref,
                                   n_planes)
        )
    ray.get(in_flight)
    _commit_meta(
        index_dir,
        {"kind": "lsh", "n_planes": n_planes, "n_tables": n_tables,
         "seed": seed, "dim": dim, "n_fragments": len(files),
         "stamp": _corpus_stamp(sf_dir)},
    )
    return index_dir


def lsh_topk(
    sf_dir: str, n_queries: int = 5, k: int = 10,
    n_planes: int = 4, n_tables: int = 24, seed: int = 13,
    index_dir: str | None = None, return_stats: bool = False,
):
    """Approximate top-k probing the PERSISTED LSH index.

    A probe hashes each query through the same plane matrices and reads
    ONLY the ``t=<i>/b=<bucket>/`` partitions its signatures name —
    24 tables x <=n_queries buckets out of 24 x 16 dirs; the full table
    is never scanned or re-signed. Candidate sets are identical to the
    round-4 scan version (same signatures), so measured recall carries
    over: 0.98 (sf0.01) / 1.00 (sf0.1) vs brute force, asserted >=0.8 by
    the driver-facing wrapper. Replica hits (one per matching table) are
    deduped in the driver merge; scores are identical across replicas so
    the dedup is exact. On these near-uniform synthetic embeddings the
    union of 24x16 buckets reads ~n_tables/n_buckets = 1.5x the table —
    uniform data is LSH's worst case; the layout exists for clustered
    real-world embeddings where probes touch a tiny file fraction."""
    from glob import glob as _glob

    if index_dir is None:
        index_dir = lsh_build_index(sf_dir, n_planes, n_tables, seed)
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    planes = _lsh_planes(n_tables, n_planes, q_mat.shape[1], seed)
    q_sigs = _lsh_signatures(q_mat, planes)
    n_buckets = 1 << n_planes

    pairs = sorted(
        {(t_i, int(q_sigs[t_i, qi]))
         for t_i in range(n_tables) for qi in range(len(q_ids))}
    )
    files = []
    for t_i, b in pairs:
        files += sorted(
            _glob(os.path.join(index_dir, f"t={t_i}", f"b={b}", "*.parquet"))
        )
    all_files = sorted(
        _glob(os.path.join(index_dir, "t=*", "b=*", "*.parquet"))
    )
    q_keys = [
        np.array(
            [t_i * n_buckets + int(q_sigs[t_i, qi])
             for t_i in range(n_tables)],
            np.int64,
        )
        for qi in range(len(q_ids))
    ]
    q_ref = ray.put((q_ids, q_mat, q_keys))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("query_id", pa.int64()), ("vec_id", pa.int64()),
                 ("sim", pa.float64())]
            ).empty_table()
        q_ids, q_mat, q_keys = ray.get(q_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = t["tb_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            cand = np.isin(keys, q_keys[qi]) & (ids != qid)
            if not cand.any():
                continue
            cvids = ids[cand]
            # replicas of one vec_id may share this batch — score each once
            uniq_ids, first = np.unique(cvids, return_index=True)
            row = q_mat[qi] @ m[cand][first].T
            kk = min(k, len(uniq_ids))
            sel = np.argpartition(-row, kk - 1)[:kk]
            out_q += [qid] * len(sel)
            out_v += uniq_ids[sel].tolist()
            out_s += row[sel].tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        rd.read_parquet(files, columns=["vec_id", "tb_key", "embedding"])
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out = _merge_topk(partials, k, dedup=True)
    if return_stats:
        return out, {
            "files_read": files,
            "files_total": len(all_files),
            "dirs_probed": [
                os.path.join(index_dir, f"t={t_i}", f"b={b}")
                for t_i, b in pairs
            ],
            "buckets_probed": len(pairs),
            "buckets_total": n_tables * n_buckets,
            "index_dir": index_dir,
        }
    return out


def power_iteration(
    sf_dir: str, iters: int = 3, scale: int = 1000
) -> pa.Table:
    """(dim, v_scaled): the corpus's top PRINCIPAL DIRECTION by integer
    power iteration over the (uncentered) Gram matrix — the PageRank/
    k-means exact-integer trick applied to PCA: quantize vectors to
    fixed-point int64, accumulate G = X^T X from per-batch d x d integer
    partials, then iterate v <- trunc(G v * scale / max|G v|) from the
    ones vector in exact arbitrary-precision integers on the driver.

    Scale shape: ONE streaming pass over the vectors; each batch ships a
    melted d^2-row partial (d = embedding dim, fixed), the global sum is
    a d^2-DOMAIN-bounded native aggregate, and the driver holds only the
    d x d Gram matrix and the d-vector — never a row count. Python ints
    make the iteration overflow-free at any corpus size; the SQL twin
    reproduces every step in HUGEINT with the same truncating division
    (sign(w) * (|w| * scale // m) — DuckDB's // truncates toward zero,
    Python's floors, so the magnitude form is used on both engines).
    Sign convention: iteration from the all-ones vector is deterministic,
    so both engines land on the same of the two +-eigendirections."""
    from ray.data.aggregate import Sum

    dims_schema = pa.schema(
        [("i", pa.int64()), ("j", pa.int64()), ("gv", pa.int64())]
    )

    def gram_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return dims_schema.empty_table()
        x = _scaled_batch(t, scale)
        g = x.T @ x
        d = g.shape[0]
        return pa.table(
            {
                "i": pa.array(np.repeat(np.arange(1, d + 1), d), pa.int64()),
                "j": pa.array(np.tile(np.arange(1, d + 1), d), pa.int64()),
                "gv": pa.array(g.reshape(-1), pa.int64()),
            }
        )

    rows = (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )
        .map_batches(gram_partial, batch_format="pyarrow")
        .groupby(["i", "j"])  # d^2 groups: domain-bounded, native is fine
        .aggregate(Sum("gv", alias_name="gv"))
        .take_all()  # O(d^2)
    )
    d = max(int(r["i"]) for r in rows)
    G = [[0] * d for _ in range(d)]
    for r in rows:
        G[int(r["i"]) - 1][int(r["j"]) - 1] = int(r["gv"])

    def trunc_div(w: int, m: int) -> int:
        return -((-w * scale) // m) if w < 0 else (w * scale) // m

    v = [1] * d
    for _ in range(iters):
        w = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w) or 1
        v = [trunc_div(x, m) for x in w]
    return pa.table(
        {
            "dim": pa.array(range(1, d + 1), pa.int64()),
            "v_scaled": pa.array(v, pa.int64()),
        }
    )


def quantized_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pa.Table:
    """(query_id, rank, vec_id, score_q): top-k by int8-QUANTIZED dot
    product — the scalar-quantization memory/SIMD trade every large ANN
    index makes (FAISS SQ8: 4x smaller vectors, integer arithmetic). The
    whole pipeline is exact integer math, so unlike the float ANN family
    this one has a bit-exact SQL twin rather than a recall bound.

    Quantization contract (identical in numpy and the DuckDB oracle):
    fixed-point f_i = FLOOR(v_i * 1e6) as int64, per-vector magnitude
    m = MAX(|f_i|), q_i = sign(f_i) * ((|f_i| * 127) // m) — magnitude
    floor-division, i.e. TRUNCATION toward zero (DuckDB's ``//`` on
    signed values), so both engines compute the same int8 codes. Score =
    integer dot product of codes; ties break by vec_id.

    Scale shape: same plan as :func:`brute_force_topk` — broadcast
    quantized query codes, per-batch vectorized quantize + int64 matmul,
    per-batch exact top-k preselect (lexsort on (-score, vec_id)), then
    an O(batches * k * n_queries) driver merge.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    mask = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False) < n_queries)
    sub = t.filter(pa.array(mask))
    q_ids = sub["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(q_ids)
    q_ids = q_ids[order]
    q_codes = _quantize_i8(
        np.stack(sub["embedding"].to_pylist()).astype(np.float64)[order]
    )
    q_ref = ray.put((q_ids, q_codes))

    def score(t: pa.Table) -> pa.Table:
        q_ids, q_codes = ray.get(q_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _quantize_i8(np.stack(t["embedding"].to_pylist()))
        sims = q_codes @ codes.T  # exact int64 matmul
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])
        for qi, qid in enumerate(q_ids):
            row = sims[qi]
            top = np.lexsort((ids, -row))[:kk]  # exact tie-broken order
            for j in top:
                if ids[j] == qid:
                    continue
                out_q.append(qid)
                out_v.append(ids[j])
                out_s.append(int(row[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score_q": pa.array(out_s, pa.int64()),
            }
        )

    partials = (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    merged = (
        partials.sort_values(["query_id", "score_q", "vec_id"],
                             ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
    )
    merged["rank"] = merged.groupby("query_id").cumcount() + 1
    out = merged[["query_id", "rank", "vec_id", "score_q"]].reset_index(
        drop=True
    )
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()),
             ("vec_id", pa.int64()), ("score_q", pa.int64())]
        )
    )


def _quantize_i8(emb: np.ndarray) -> np.ndarray:
    """Vectorized int8 scalar quantization (the quantized_topk contract)."""
    f = np.floor(emb * 1e6).astype(np.int64)
    m = np.abs(f).max(axis=1)
    m[m == 0] = 1  # all-zero rows quantize to zero codes anyway
    return np.sign(f) * ((np.abs(f) * 127) // m[:, None])
