"""Similarity search over an embedding column (training-data pipeline).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch scores a dense numpy matmul against it;
per-batch top-k partials are then merged in one tiny driver-side reduction
(k x n_queries rows). Scale path: LSH-bucketed variant — random-hyperplane
signatures bucket both queries and vectors, so each batch only scores
queries sharing a bucket (candidate-set pruning instead of full scan).
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
    cent2_ref = ray.put((new_ids.astype(np.int64), new_cents.astype(np.int64)))

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


def lsh_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
             n_planes: int = 4, n_tables: int = 24, seed: int = 13) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH candidate pruning.

    Each of n_tables signature functions buckets vectors by the sign
    pattern of n_planes projections; a vector is scored only if it shares a
    bucket with the query in ANY table. Same output schema as
    brute_force_topk plus ``n_candidates`` is traded for recall — the unit
    tests measure recall against the exact result.

    Defaults tuned on the synthetic sf corpora (near-uniform random
    embeddings — the hardest case for LSH, since true neighbors are barely
    closer than the bulk): 4 planes x 24 tables measures recall 0.98
    (sf0.01) / 1.00 (sf0.1); the query wrappers assert >=0.8. Clustered
    real-world embeddings would reach the same recall with far fewer,
    deeper tables.
    """
    rng = np.random.RandomState(seed)
    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    dim = q_mat.shape[1]
    planes = rng.randn(n_tables, n_planes, dim)

    def signatures(m: np.ndarray) -> np.ndarray:
        """(n_tables, n_rows) int bucket ids."""
        sigs = np.empty((n_tables, m.shape[0]), dtype=np.int64)
        pows = (1 << np.arange(n_planes)).astype(np.int64)
        for t_i in range(n_tables):
            bits = (m @ planes[t_i].T) > 0
            sigs[t_i] = bits.astype(np.int64) @ pows
        return sigs

    q_sigs = signatures(q_mat)
    q_ref = ray.put((q_ids, q_mat, q_sigs))

    def score(t: pa.Table) -> pa.Table:
        q_ids, q_mat, q_sigs = ray.get(q_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(t["embedding"].to_pylist()).astype(np.float64))
        sigs = signatures(m)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            cand = np.zeros(len(ids), dtype=bool)
            for t_i in range(n_tables):
                cand |= sigs[t_i] == q_sigs[t_i, qi]
            cand &= ids != qid
            if not cand.any():
                continue
            row = q_mat[qi] @ m[cand].T
            cids = ids[cand]
            kk = min(k, len(cids))
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q += [qid] * len(idx)
            out_v += cids[idx].tolist()
            out_s += row[idx].tolist()
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


def ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
             n_lists: int = 6, n_probe: int = 5, seed: int = 29,
             kmeans_iters: int = 8, sample: int = 2048) -> pa.Table:
    """Approximate top-k via an IVF (inverted-file) index — the scale path.

    Train: k-means centroids on a DISTRIBUTED deterministic sample — a
    multiplicative hash of vec_id picks ~2x``sample`` rows inside
    map_batches, so only the bounded sample ever reaches the driver (the
    full embedding table never does). Index: each vector belongs to its
    nearest centroid's list — assignment happens per batch with one matmul
    (distributed). Search: a query scans only its n_probe nearest lists
    instead of the full collection; the centroid matrix broadcasts once via
    ray.put. Recall is measured against brute force in the unit tests and
    asserted at query time by the driver-facing wrapper.

    Defaults tuned on the synthetic sf corpora: the embeddings are
    near-uniform random vectors, so recall tracks the scanned fraction
    almost linearly (no cluster structure for the centroids to exploit) —
    probing 5 of 6 lists measures recall 0.94 at BOTH sf0.01 and sf0.1;
    the query wrapper asserts >=0.8. On clustered real embeddings the same
    index reaches high recall at a much smaller probe fraction.
    """
    q_ids, q_mat = _load_queries(sf_dir, n_queries)

    # --- train centroids on a distributed sample (deterministic:
    # vec_id-hash pick, vec_id-sorted, truncated to `sample`) ---
    emb_ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    n_total = max(emb_ds.count(), 1)
    cutoff = np.uint64(min(1.0, (2.0 * sample) / n_total) * (1 << 32))

    def pick(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = ((ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) < cutoff
        return t.filter(pa.array(keep))

    sample_df = (
        emb_ds.map_batches(pick, batch_format="pyarrow")
        .to_pandas()  # bounded: ~2*sample rows by construction
        .sort_values("vec_id")
        .head(sample)
    )
    train = _normalize(np.stack(sample_df["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cent = train[rng.choice(len(train), size=min(n_lists, len(train)),
                            replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(train @ cent.T, axis=1)  # cosine on unit vectors
        for c in range(len(cent)):
            members = train[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    cent_ref = ray.put(cent)

    # queries probe their n_probe nearest lists
    q_lists = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    q_ref = ray.put((q_ids, q_mat, q_lists))

    def score(tbl: pa.Table) -> pa.Table:
        q_ids, q_mat, q_lists = ray.get(q_ref)
        centroids = ray.get(cent_ref)
        ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(tbl["embedding"].to_pylist()).astype(np.float64))
        assign = np.argmax(m @ centroids.T, axis=1)  # IVF assignment
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            cand = np.isin(assign, q_lists[qi]) & (ids != qid)
            if not cand.any():
                continue
            row = q_mat[qi] @ m[cand].T
            cids = ids[cand]
            kk = min(k, len(cids))
            sel = np.argpartition(-row, kk - 1)[:kk]
            out_q += [qid] * len(sel)
            out_v += cids[sel].tolist()
            out_s += row[sel].tolist()
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
