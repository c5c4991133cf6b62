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
import pyarrow.compute as pc
import ray.data as rd

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "embedding_near_dup",
    "dedup_clusters",
    "dedup_survivors",
    "incremental_dedup",
    "containment_pairs",
    "semdedup",
    "edit1_pairs",
    "dedup_source_stats",
    "shingles",
    "jaccard",
    "MinHasher",
    "simhash64",
]


# documents tables here are shuffle-bound, not scan-bound: Ray's default
# block splitting (64+) makes every groupby pay 64-partition fixed costs on
# a few-MB table. Derive the block count from the input size (±32 MB per
# block, floor 8) so small tables stay cheap and large corpora still spread.
_DOC_BLOCK_BYTES = 32 << 20


def doc_blocks(sf_dir: str, floor: int = 8) -> int:
    try:
        size = os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
    except OSError:
        return floor
    return max(floor, -(-size // _DOC_BLOCK_BYTES))


def coarse_parts(sf_dir: str) -> int:
    """Coarse map_groups partition width for the dedup/retrieval family
    (power of two, so the partition key is a cheap ``& (n-1)`` mask).

    Every use site groups by ``hash & (coarse_parts-1)`` and resolves the
    exact keys inside each partition with pandas' C groupby, so each
    partition's in-heap frame is corpus/n — n must GROW with the corpus or
    the frame grows linearly with it. Derived from corpus size (~2 doc
    blocks, i.e. ~64 MB of text, per partition) and the session's CPUs
    (>=2x cores so the reduce side keeps every core busy); floor 64 (the
    32-CPU test-box width). RAYCRAWL_CPARTS pins it. All outputs are
    partition-count-invariant: the mask only places rows, every
    same-key row still colocates for any width.
    """
    env = os.environ.get("RAYCRAWL_CPARTS")
    if env:
        n = int(env)
        if n <= 0 or n & (n - 1):
            raise ValueError(
                f"RAYCRAWL_CPARTS must be a positive power of two, got {n}"
            )
        return n
    from raycrawl.pipelines.relops import _cluster_cpus

    want = max(64, 2 * _cluster_cpus(), doc_blocks(sf_dir) // 2)
    return 1 << (want - 1).bit_length()


def _read_docs(sf_dir: str, columns):
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=columns,
        override_num_blocks=doc_blocks(sf_dir),
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _arrow_block_task(blk, names):
    """Normalize one block to an Arrow table with the given columns;
    returns (table, num_rows). Runs as a Ray task (see clean_blocks)."""
    if isinstance(blk, pd.DataFrame):
        t = pa.Table.from_pandas(blk, preserve_index=False)
    else:
        t = blk
    if t.num_rows == 0:
        return t, 0
    return t.select(list(names)), t.num_rows


def coarse_key(df, cols, mask) -> "np.ndarray":
    """Coarse partition key over column tuples: per-column
    ``pd.util.hash_array`` mixed NUMERICALLY (never string-concatenated —
    hash_array truncates object strings at embedded NULs, the boilerplate
    lesson), masked to the coarse width."""
    acc = np.zeros(len(df), np.uint64)
    for c in cols:
        h = pd.util.hash_array(df[c].to_numpy(), categorize=False)
        acc = acc * np.uint64(1000003) + h
    return (acc & np.uint64(mask)).astype(np.int64)


def coarse_distinct(ds: rd.Dataset, cols, mask: int) -> rd.Dataset:
    """DISTINCT rows over ``cols`` via one coarse-hash shuffle + Arrow's
    C hash dedup per partition.

    The native ``groupby(cols).aggregate(...)`` route emits one group per
    distinct row — and Ray's hash aggregate costs ~10 s per 0.4M groups
    even on clean Arrow blocks (170 s measured on pandas-origin blocks in
    the n-gram pair pipeline). A distinct whose output cardinality scales
    with the corpus must therefore never be a native aggregate; this is
    the repo's standard coarse-partition resolution applied to DISTINCT.

    Dedup runs through pyarrow ``group_by`` — NEVER pandas
    drop_duplicates/groupby on string keys: pandas' khash factorization
    treats object strings as C strings, so 'a', 'a\\x00b' and 'a\\x00c'
    all COLLAPSE to one "distinct" row (measured; the broader form of the
    boilerplate-batch hash_array lesson — hash_array itself hashes the
    full bytes). Output blocks are pandas-origin — wrap in
    :func:`clean_blocks` before a native join."""
    cols = list(cols)

    def add_pp(t: pa.Table) -> pa.Table:
        f = t.select(cols).group_by(cols).aggregate([])  # local, NUL-safe
        pp = coarse_key(f.to_pandas(), cols, mask)
        return f.append_column("pp", pa.array(pp, pa.int64()))

    def dd_part(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(g[cols], preserve_index=False)
        return t.group_by(cols).aggregate([]).to_pandas()

    return (
        ds.map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(dd_part, batch_format="pandas")
    )


def coarse_sum(ds: rd.Dataset, key_cols, val_cols, mask: int) -> rd.Dataset:
    """Grouped integer SUM over ``key_cols`` whose OUTPUT cardinality
    scales with the data (token/n-gram/pair count tables) — the
    :func:`coarse_distinct` plan with an in-partition Arrow sum instead
    of a dedup: per-batch partial aggregate, coarse-hash shuffle, pyarrow
    ``group_by`` per partition (binary-safe on string keys — pandas'
    multi-key factorization NUL-truncates). Native aggregates stay for
    domain-bounded groups only (the cost rule, BASELINE.md r4)."""
    keys, vals = list(key_cols), list(val_cols)

    def add_pp(t: pa.Table) -> pa.Table:
        g = t.select(keys + vals).group_by(keys).aggregate(
            [(v, "sum") for v in vals]
        )
        g = g.rename_columns(keys + vals)  # arrow emits keys first
        pp = coarse_key(g.to_pandas(), keys, mask)
        return g.append_column("pp", pa.array(pp, pa.int64()))

    def sum_part(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(g[keys + vals], preserve_index=False)
        out = t.group_by(keys).aggregate([(v, "sum") for v in vals])
        return out.rename_columns(keys + vals).to_pandas()

    return (
        ds.map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(sum_part, batch_format="pandas")
    )


def coarse_min(ds: rd.Dataset, key_cols, val_cols, mask: int) -> rd.Dataset:
    """Grouped MIN twin of :func:`coarse_sum` (min is associative, so the
    per-batch partial + in-partition resolve is exact) — same coarse-hash
    plan, same binary-safe pyarrow ``group_by``."""
    keys, vals = list(key_cols), list(val_cols)

    def add_pp(t: pa.Table) -> pa.Table:
        g = t.select(keys + vals).group_by(keys).aggregate(
            [(v, "min") for v in vals]
        )
        g = g.rename_columns(keys + vals)
        pp = coarse_key(g.to_pandas(), keys, mask)
        return g.append_column("pp", pa.array(pp, pa.int64()))

    def min_part(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(g[keys + vals], preserve_index=False)
        out = t.group_by(keys).aggregate([(v, "min") for v in vals])
        return out.rename_columns(keys + vals).to_pandas()

    return (
        ds.map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(min_part, batch_format="pandas")
    )


def clean_blocks(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Rebuild ``ds`` from only its NON-EMPTY blocks, as Arrow tables with
    ``schema``'s columns.

    Workaround for a Ray Data sharp edge: groupby/map_groups stages emit
    SCHEMA-LESS empty blocks for empty partitions, empty blocks bypass
    map_batches UDFs (so they cannot be normalized in-stream), and
    ``Dataset.join`` fails on them ("No match ... for key field reference
    ... on left side"). Blocks stay in the object store — one tiny task per
    block converts/filters; the driver only sees per-block row counts.
    """
    import ray

    fn = ray.remote(num_cpus=0.25, num_returns=2)(_arrow_block_task)
    refs = ds.materialize().to_arrow_refs()
    outs = [fn.remote(r, schema.names) for r in refs]
    counts = ray.get([o[1] for o in outs])
    good = [o[0] for o, n in zip(outs, counts) if n]
    if not good:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(good)


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

    mask = coarse_parts(sf_dir) - 1

    def add_hash(t: pa.Table) -> pa.Table:
        # coarse partition key (width from coarse_parts) derived from the
        # content hash: the shuffle co-locates equal texts without a
        # per-distinct-text group (pandas' C groupby resolves exact groups
        # inside each partition)
        hashes = np.fromiter(
            (_hash64_bytes((x or "").encode()) & mask
             for x in t["text"].to_pylist()),
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


def _shingle_hash_rows(t: pa.Table, k: int):
    """Vectorized batch twin of :func:`shingles`: the DISTINCT (row index,
    shingle hash64) pairs for every doc in the batch, bit-identical to
    ``{_hash64_bytes(s) for s in shingles(text, k)}`` per row (the
    round-5 fix for the per-doc Python signer loops — VERDICT r4 #2).

    Tokenize = one Arrow ``\\s+`` split (== ``\\S+`` findall), k-shingles
    = k shifted slices joined element-wise in C with row-crossing windows
    masked (the textops._shingles plan, minus its lowercasing — the
    shingle contract hashes RAW tokens), short rows (0 < n_words < k) get
    their single all-words shingle via O(1) offset slices, and blake2b
    runs once per batch-UNIQUE shingle string instead of once per
    occurrence. Returns (rows, hashes, words_per_row)."""
    import pyarrow.compute as pc

    txt = t["text"]
    if txt.null_count:
        txt = pc.fill_null(txt, "")  # shingles(text or "")
    toks = pc.split_pattern_regex(txt, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat_arr = toks.flatten()
    offs = toks.offsets.to_numpy()
    trow = np.repeat(np.arange(len(t)), np.diff(offs))
    # drop the empty strings a leading/trailing-whitespace split produces
    # (findall(\S+) has none) — one C filter, tokens stay in Arrow
    nonempty = pc.not_equal(pc.binary_length(flat_arr), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    if not ne.all():
        flat_arr = flat_arr.filter(nonempty)
        trow = trow[ne]
    cnt = np.bincount(trow, minlength=len(t)).astype(np.int64)

    m = len(flat_arr) - k + 1
    if m > 0:
        ok = trow[:m] == trow[k - 1:]
        # k shifted ZERO-COPY Arrow slices joined element-wise in C —
        # token strings never round-trip through numpy object arrays
        parts = [flat_arr.slice(i, m) for i in range(k)]
        joined = pc.binary_join_element_wise(*parts, " ").filter(
            pa.array(ok)
        )
        srow = trow[:m][ok]
    else:
        joined, srow = pa.array([], pa.string()), np.empty(0, np.int64)

    short = np.flatnonzero((cnt > 0) & (cnt < k))
    if len(short):
        # rare path (docs with 0 < n_words < k): one all-words shingle
        # each, via a rebuilt ListArray + one vectorized binary_join
        starts = (np.cumsum(cnt) - cnt)[short]
        word_idx = np.concatenate(
            [np.arange(s, s + n) for s, n in zip(starts, cnt[short])]
        )
        packed = flat_arr.take(pa.array(word_idx, pa.int64()))
        po = np.r_[0, np.cumsum(cnt[short])].astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(po, pa.int32()), packed)
        extra = pc.binary_join(lists, " ")
        joined = pa.concat_arrays(
            [joined.combine_chunks() if isinstance(joined, pa.ChunkedArray)
             else joined, extra]
        )
        srow = np.concatenate([srow, short.astype(np.int64)])

    if not len(srow):
        return np.empty(0, np.int64), np.empty(0, np.int64), cnt
    # hash once per batch-UNIQUE shingle string. Arrow dictionary_encode
    # is BINARY-safe C hashing (np.unique's comparison sort on object
    # strings is ~10x slower; pandas factorize NUL-truncates — even
    # single-column, not just the multi-key case in the CLAUDE.md
    # invariant: factorize(['b\\x00','b']) collapses to one code)
    enc = joined.dictionary_encode()
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uh = np.fromiter(
        (_hash64_bytes(s.encode()) for s in enc.dictionary.to_pylist()),
        np.int64, len(enc.dictionary),
    )
    h = uh[inv]
    # distinct per (row, hash) — the set() semantics of shingles()
    order = np.lexsort((h, srow))
    srow, h = srow[order], h[order]
    d = np.ones(len(h), bool)
    d[1:] = (srow[1:] != srow[:-1]) | (h[1:] != h[:-1])
    return srow[d].astype(np.int64), h[d], cnt


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
    candidate pairs within each bucket. Stage 3: dedup pairs
    (coarse-partitioned), then verify with exact Jaccard: the pair set is
    melted to one row per (pair, side) and hash-joined back against the
    docs table on doc_id (``_verify_jaccard_pairs``) — text is never
    broadcast or collected, so verify scales with the pair count, not
    the corpus.
    """
    rows_per_band = n_perms // n_bands
    mask = coarse_parts(sf_dir) - 1

    # plain task fns (not actor pools): the per-call state (MinHasher
    # params / a cached ray.get of the broadcast store) is microseconds to
    # reacquire, and task stages never deadlock against shuffle stages on
    # reserved CPUs the way chained actor pools can on small machines
    def signer(t: pa.Table) -> pa.Table:
        # vectorized (round 5): ONE Arrow shingle pass + ONE (shingles x
        # perms) universal-hash broadcast + a segmented min for the whole
        # batch — byte-identical to the per-doc MinHasher.signature loop
        # (same uint64 wrap, same mod-Mersenne, same band chunk bytes)
        mh = MinHasher(n_perms=n_perms)
        n = len(t)
        srow, h, _ = _shingle_hash_rows(t, k)
        sig = np.zeros((n, n_perms), np.uint64)  # empty docs: zero sig
        if len(h):
            x = h.astype(np.uint64)
            # (n_perms, n_shingles) orientation: reduceat along axis=1
            # walks contiguous memory (12x faster than axis=0 on the
            # transposed layout; minimum.at is slower still)
            M = np.uint64(mh._MERSENNE)
            v = (
                mh.a.astype(np.uint64)[:, None] * x[None, :]
                + mh.b.astype(np.uint64)[:, None]
            )
            # v % M for Mersenne M=2^61-1 via fold: (v&M)+(v>>61) < 2M,
            # one conditional subtract — identical to the hardware-div
            # `%` MinHasher.signature uses, ~4x faster on uint64
            vals = (v & M) + (v >> np.uint64(61))
            vals -= np.where(vals >= M, M, np.uint64(0))
            starts = np.flatnonzero(np.r_[True, srow[1:] != srow[:-1]])
            sig[srow[starts]] = np.minimum.reduceat(vals, starts, axis=1).T
        chunks = sig.reshape(n * n_bands, rows_per_band)
        band_hashes = np.fromiter(
            (_hash64_bytes(chunks[i].tobytes()) for i in range(len(chunks))),
            np.int64, len(chunks),
        )
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, n_bands), pa.int64()),
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32),
                                         n), pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "part": pa.array(band_hashes & mask, pa.int64()),
            }
        )

    # LSH buckets are numerous and tiny (mostly singletons); a per-bucket
    # UDF would pay python overhead 80k+ times. Instead: coarse-partition
    # by band_hash (coarse_parts groups -> cheap shuffle), then find same-bucket runs
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

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    from ray.data.aggregate import Count

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    cands = clean_blocks(
        docs.map_batches(signer, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
        # global pair dedup via native hash aggregation (no per-group UDF)
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="n")),
        pair_schema,
    )
    return _verify_jaccard_pairs(cands, sf_dir, k, threshold, mask)


def _verify_jaccard_pairs(cands: rd.Dataset, sf_dir: str, k: int,
                          threshold: float, mask: int,
                          accept=None) -> rd.Dataset:
    """Exact-Jaccard verification of candidate pairs, shared by the
    minhash and prefix-filter candidate generators.

    Fetches the two texts of each candidate pair with ONE hash join back
    against the docs table on doc_id — the pair set is sparse, the docs
    side streams hash-partitioned; nothing is materialized driver-side
    (at 100 TB a broadcast id->text map cannot exist). Pairs MELT to two
    (doc_id, id_a, id_b) rows so a single docs shuffle serves both sides;
    the joined rows reassemble per pair inside coarse_parts partitions
    (pandas C groupby — no per-pair UDF dispatch).

    ``accept(shingles_a, shingles_b) -> bool`` overrides the similarity
    predicate (default: exact Jaccard >= threshold) so containment-style
    joins share the whole plan."""
    if accept is None:
        def accept(sa, sb):
            return jaccard(sa, sb) >= threshold

    def melt(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks()
        b = t["id_b"].combine_chunks()
        return pa.table(
            {
                "doc_id": pa.concat_arrays([a, b]),
                "id_a": pa.concat_arrays([a, a]),
                "id_b": pa.concat_arrays([b, b]),
            }
        )

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        texts = dict(zip(g["doc_id"], g["text"]))  # group-local only
        shcache: dict = {}  # a doc appears in MANY pairs: shingle once

        def sh(d):
            s = shcache.get(d)
            if s is None:
                s = shcache[d] = shingles(texts[d], k)
            return s

        seen = set()
        for a, b in zip(g["id_a"], g["id_b"]):
            if (a, b) in seen or a not in texts or b not in texts:
                continue
            seen.add((a, b))
            if accept(sh(a), sh(b)):
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame(
            {"id_a": pd.array(out_a, "int64"), "id_b": pd.array(out_b, "int64")}
        )

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    n_parts = doc_blocks(sf_dir)
    texts = _read_docs(sf_dir, ["doc_id", "text"])

    def add_ppart(t: pa.Table) -> pa.Table:
        part = pc.bit_wise_and(t["id_a"], mask)
        return t.append_column("ppart", pc.cast(part, pa.int32()))

    joined = (
        cands.map_batches(melt, batch_format="pyarrow")
        .join(texts, join_type="inner", num_partitions=n_parts,
              on=("doc_id",), right_on=("doc_id",))
        .map_batches(add_ppart, batch_format="pyarrow")
    )
    pairs = (
        joined.groupby("ppart")
        .map_groups(verify_part, batch_format="pandas")
    )
    return clean_blocks(pairs, pair_schema)


def ngram_jaccard_pairs(
    sf_dir: str, k: int = 3, threshold: float = 0.5
) -> rd.Dataset:
    """Near-duplicate pairs (id_a, id_b) with Jaccard >= threshold, via
    LENGTH + PREFIX FILTERING (AllPairs-style set-similarity join) instead
    of minhash banding.

    Per doc: sort the k-shingle hash set under the global (hash-value)
    order and emit only the first ``n - ceil(t*n) + 1`` shingles — the
    prefix. The standard prefix lemma (the smallest common element of any
    pair with overlap >= a sits within both prefixes of length |x|-a+1;
    J >= t implies overlap >= ceil(t*max(|x|,|y|)) >= ceil(t*|x|)) makes
    recall EXACT by construction — unlike LSH banding there is no
    probabilistic miss to measure. Candidates then pass the length filter
    (min >= t*max) and the same melted single-join exact-Jaccard verify as
    minhash. One shuffle keyed by shingle hash (coarse partitions), pair
    volume bounded by prefix collisions rather than all-pairs."""
    mask = coarse_parts(sf_dir) - 1

    def prefixes(t: pa.Table) -> pa.Table:
        # vectorized (round 5): distinct (row, shingle-hash) pairs from
        # the shared Arrow kernel arrive sorted by (row, hash) — exactly
        # the per-doc sorted() order — so the per-doc prefix is a
        # position-in-run mask, no Python loop over docs or shingles
        srow, h, _ = _shingle_hash_rows(t, k)
        if not len(h):
            return pa.schema(
                [("gram", pa.int64()), ("doc_id", pa.int64()),
                 ("n", pa.int64()), ("part", pa.int64())]
            ).empty_table()
        sizes = np.bincount(srow, minlength=len(t)).astype(np.int64)
        starts = np.cumsum(sizes) - sizes
        pos = np.arange(len(h)) - starts[srow]
        nn = sizes[srow]
        p = nn - np.ceil(threshold * nn).astype(np.int64) + 1
        keep = pos < p  # == math.ceil on int n: ceil(t*n) exact in float64
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = h[keep]
        return pa.table(
            {
                "gram": pa.array(g, pa.int64()),
                "doc_id": pa.array(doc_ids[srow[keep]], pa.int64()),
                "n": pa.array(nn[keep], pa.int64()),
                "part": pa.array(g & mask, pa.int64()),
            }
        )

    def gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # pair generation is a SELF-JOIN on the gram — pandas' C hash
        # merge, never a Python loop over group members (the first
        # version looped and read 170 s at sf0.1). Emissions dedupe
        # in-partition, then carry a coarse pair-hash key for the global
        # dedup: a NATIVE groupby((id_a, id_b)) here would produce one
        # group per distinct pair — Ray's aggregate costs ~10 s per 0.4M
        # groups even on clean Arrow blocks (170 s measured in-pipeline)
        # — so the dedup runs as the repo's standard coarse-partition +
        # pandas C drop_duplicates instead.
        f = g[["gram", "doc_id", "n"]].drop_duplicates()
        m = f.merge(f, on="gram", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        lo = np.minimum(m["n_a"].to_numpy(), m["n_b"].to_numpy())
        hi = np.maximum(m["n_a"].to_numpy(), m["n_b"].to_numpy())
        m = m[lo >= threshold * hi]  # length filter
        out = m[["doc_id_a", "doc_id_b"]].drop_duplicates()
        a = out["doc_id_a"].to_numpy(np.int64)
        b = out["doc_id_b"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "id_a": a,
                "id_b": b,
                "pp": ((a * 1000003) ^ b) & mask,
            }
        )

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    cands = clean_blocks(
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(prefixes, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gram_pairs, batch_format="pandas")
        .groupby("pp")
        .map_groups(dedup_pairs, batch_format="pandas"),
        pair_schema,
    )
    return _verify_jaccard_pairs(cands, sf_dir, k, threshold, mask)


# ---------------------------------------------------------------------------
# near-dup cluster labeling (connected components)
# ---------------------------------------------------------------------------


def dedup_clusters(sf_dir: str, pairs_ds=None, mode: str = "auto",
                   small_pairs_limit: int = 200_000,
                   max_iters: int = 64) -> rd.Dataset:
    """(doc_id, cluster_id): connected components over near-dup pairs.

    cluster_id = min doc_id of the component; docs in no pair are their own
    cluster. Two resolution paths with identical output (tested equal):

    * ``driver`` — union-find over the streamed pair set. Chosen by
      ``auto`` only when the pair count is provably small; boilerplate-
      heavy corpora make near-dup graphs huge, so this is a fast path,
      not the design.
    * ``distributed`` — iterated min-label propagation: L(x) <-
      min(L(x), min over neighbors L(n)) via join + groupby-min per
      round until the label sum stops changing (it is monotone
      non-increasing, so equal sums == fixpoint). Near-dup components
      are clique-ish and converge in a few rounds; for DEEP graphs,
      rounds >= 2 also take a pointer-doubling hop L(L(x)) (one extra
      self-join — L(y) <= y, so it is monotone too), which doubles the
      propagated distance per round: total rounds are O(log diameter),
      so the ``max_iters`` guard is unreachable for any real graph.

    The final labeling of ALL docs is a union + groupby-min (no driver
    map): docs start as their own label and the propagated labels win.
    """
    import ray
    from ray.data.aggregate import Min

    if pairs_ds is None:
        pairs_ds = minhash_lsh_pairs(sf_dir)
    pairs = pairs_ds.materialize()  # the sparse verified near-dup graph
    n_pairs = pairs.count()

    if mode == "driver" or (mode == "auto" and n_pairs <= small_pairs_limit):
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
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

    # ---- distributed min-label propagation ----
    n_parts = max(8, doc_blocks(sf_dir))

    def docs_own_labels():
        return _read_docs(sf_dir, ["doc_id"]).map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "cluster_id": t["doc_id"]}),
            batch_format="pyarrow",
        )

    if n_pairs == 0:
        return docs_own_labels()

    def sym_edges(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks()
        b = t["id_b"].combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([a, b]),
                "dst": pa.concat_arrays([b, a]),
            }
        )

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    edges = clean_blocks(
        pairs.map_batches(sym_edges, batch_format="pyarrow"), edge_schema
    )

    def init_labels(t: pa.Table) -> pa.Table:
        nodes = t["src"]
        return pa.table({"node": nodes, "label": nodes})

    labels = clean_blocks(
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label")),
        label_schema,
    )
    prev_sum = labels.sum("label")
    converged = False
    for it in range(max_iters):
        # neighbor labels: edges ⋈ labels on dst, then take the min over
        # {self} ∪ neighbors per node
        neigh = (
            edges.join(labels, join_type="inner", num_partitions=n_parts,
                       on=("dst",), right_on=("node",))
            .select_columns(["src", "label"])
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]),
                batch_format="pyarrow",
            )
        )
        cand = labels.union(neigh)
        if it >= 2:
            # pointer doubling: also hop L(L(x)). Label values are always
            # node ids present in the table (each starts as some node's
            # min over {self} ∪ neighbors), so the self-join is total; the
            # happy clique-ish path (fixpoint in <= 2 rounds) never pays
            # for the extra join.
            tgt = labels.map_batches(
                lambda t: t.rename_columns(["tnode", "tlabel"]),
                batch_format="pyarrow",
            )
            hop = (
                labels.join(tgt, join_type="inner", num_partitions=n_parts,
                            on=("label",), right_on=("tnode",))
                .select_columns(["node", "tlabel"])
                .map_batches(
                    lambda t: t.rename_columns(["node", "label"]),
                    batch_format="pyarrow",
                )
            )
            cand = cand.union(hop)
        labels = clean_blocks(
            cand.groupby("node").aggregate(Min("label", alias_name="label")),
            label_schema,
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # monotone non-increasing -> fixpoint
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # non-convergence would mean silently WRONG (split) cluster ids —
        # refuse rather than mislabel. With pointer doubling this needs a
        # component diameter ~2^(max_iters-2): unreachable, pure safety net.
        raise RuntimeError(
            f"cluster label propagation did not reach a fixpoint in "
            f"{max_iters} iterations; rerun with a larger max_iters"
        )

    def own_label(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["doc_id"], "label": t["doc_id"]})

    # every doc starts as its own cluster; propagated (smaller) labels win
    all_labels = (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(own_label, batch_format="pyarrow")
        .union(labels)
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .select_columns(["node", "label"])
    )
    return all_labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
    )


def dedup_survivors(sf_dir: str, **cluster_kw) -> rd.Dataset:
    """(doc_id): the RETAINED corpus after near-dup clustering — the
    canonical doc (min doc_id == its cluster label) of every cluster,
    singletons included. This is the materialization step a dedup pipeline
    actually ships: cluster, keep one per cluster, drop the rest.

    Pure streaming filter over :func:`dedup_clusters` — no extra shuffle,
    no driver work beyond what clustering already did.
    """

    def keep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.filter(pc.equal(t["doc_id"], t["cluster_id"]))["doc_id"]}
        )

    return dedup_clusters(sf_dir, **cluster_kw).map_batches(
        keep, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_BIT_POS = np.arange(64, dtype=np.uint64)
_BIT_VAL = (np.uint64(1) << _BIT_POS)


def _md5_word_hash(word: str) -> int:
    """64-bit word feature hash: first 8 bytes of md5, big-endian — chosen
    because DuckDB's md5() reproduces it exactly, which is what lets the
    dedup_simhash oracle recompute every simhash in SQL."""
    return int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "big")


def simhash64_batch(texts, _cache_size: int = 1 << 16) -> np.ndarray:
    """Vectorized simhash per doc (int64 carrier array).

    Per doc: one gather of cached word hashes, ONE (n_words, 64) bit
    unpack + column sum — no per-word numpy ops (the per-word path was
    measured orders of magnitude slower). The word->hash cache persists
    for the batch; vocabulary repeats across docs make it ~free.
    """
    cache: dict = {}
    out = np.zeros(len(texts), dtype=np.int64)
    for di, text in enumerate(texts):
        words = _WORD.findall(text or "")
        if not words:
            continue
        hs = np.empty(len(words), dtype=np.uint64)
        for wi, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = _md5_word_hash(w)
                if len(cache) < _cache_size:
                    cache[w] = h
            hs[wi] = h
        bits = ((hs[:, None] >> _BIT_POS[None, :]) & np.uint64(1)).astype(np.int32)
        acc = bits.sum(axis=0) * 2 - len(words)  # sum of (+1/-1) per bit
        out[di] = _BIT_VAL[acc > 0].sum().astype(np.uint64).astype(np.int64)
    return out


def simhash64(text: str) -> int:
    """64-bit simhash over word features (unsigned value in int64 carrier)."""
    return int(simhash64_batch([text])[0])


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash: 4x16-bit band blocking (any pair within
    Hamming<=3 shares at least one exact 16-bit band — pigeonhole), then
    exact Hamming verification inside each block."""

    # partition key is derived from the 16-bit band key, so its useful
    # granularity caps at 2^16 partitions (plenty: partitions only need to
    # outnumber cores, the per-partition frame is bounded by key dispersion)
    mask = np.int32(min(coarse_parts(sf_dir) - 1, 0xFFFF))

    def sign(t: pa.Table) -> pa.Table:
        sims = simhash64_batch(t["text"].to_pylist())
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = sims.view(np.uint64)
        # explode to 4 banded rows per doc, all vectorized
        n = len(ids)
        out_ids = np.repeat(ids, 4)
        out_band = np.tile(np.arange(4, dtype=np.int32), n)
        shifts = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        out_key = ((np.repeat(u, 4) >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "band": pa.array(out_band),
                "key": pa.array(out_key),
                "simhash": pa.array(np.repeat(sims, 4)),
                "part": pa.array(out_key & mask),
            }
        )

    # coarse-partitioned like minhash_lsh_pairs: blocks are tiny and
    # numerous, so pandas' C groupby finds same-(band,key) runs inside coarse
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
                # vectorized popcount: bytes view + unpackbits
                hams = np.unpackbits(
                    x.view(np.uint8).reshape(len(x), 8), axis=1
                ).sum(axis=1)
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


def _cosine_block_pairs(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Exact (id_a, id_b) pairs with cosine >= threshold inside one block:
    dense |B|x|B| float64 matmul, upper triangle only."""
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


def embedding_near_dup(
    sf_dir: str,
    threshold: float = 0.95,
    blocking: str = "label",
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 11,
    ds: rd.Dataset | None = None,
) -> rd.Dataset:
    """(id_a, id_b) pairs with cosine >= threshold, scored only within
    blocks (never all-pairs).

    ``blocking="label"`` uses the label column as the block key — exact
    (and oracle-checkable) when a clustering key exists. ``blocking="lsh"``
    is the scale path for UNLABELED data: each vector lands in
    ``n_tables`` random-hyperplane sign buckets, candidate pairs are
    exactly verified (cosine in float64) inside each bucket, and the
    cross-table duplicates collapse in a native hash aggregation — so
    precision is exact and per-pair recall is 1-(1-p^n_planes)^n_tables
    with p = 1 - theta/pi. Size ``n_planes`` to the threshold: defaults
    (4 planes x 12 tables) give >=0.999 for true near-dups (cosine 0.9+,
    p~=0.86/plane) while keeping buckets small; a LOOSE threshold like
    0.3 (theta 72deg, p~=0.6) needs fewer planes for the borderline
    pairs — n_planes=2 measures ~0.99 recall at threshold 0.3 (see
    test_embedding_lsh_blocking). The shuffle moves n_tables copies of
    (bucket, id, vec), never an all-pairs matrix."""

    def block(g: pd.DataFrame) -> pd.DataFrame:
        return _cosine_block_pairs(g, threshold)

    if ds is None:
        ds = rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding", "label"],
        )
    if blocking == "label":
        return ds.groupby("label").map_groups(block, batch_format="pandas")

    # --- LSH sign-bucket blocking (deterministic planes from the seed) ---
    def fan_out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block: np.stack([]) would raise
            return pa.schema(
                [("bucket", pa.int64()), ("vec_id", pa.int64()),
                 ("embedding", t.schema.field("embedding").type)]
            ).empty_table()
        # planes are derived from the seed per batch (64*n cheap doubles);
        # sign bits -> one bucket id per (vector, table)
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((m.shape[1], n_tables * n_planes))
        bits = (m @ planes) >= 0.0  # (rows, tables*planes)
        bits = bits.reshape(len(m), n_tables, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        codes = (bits * weights).sum(axis=2)  # (rows, tables)
        table_ids = np.arange(n_tables, dtype=np.int64)
        bucket = (table_ids[None, :] << n_planes) | codes  # (rows, tables)
        # table-major layout: [table0 rows..., table1 rows...] so the
        # replicated embedding column is a plain concat (no row gather)
        emb = t["embedding"].combine_chunks()
        return pa.table(
            {
                "bucket": pa.array(bucket.T.reshape(-1), pa.int64()),
                "vec_id": pa.array(
                    np.tile(t["vec_id"].to_numpy(), n_tables), pa.int64()
                ),
                "embedding": pa.concat_arrays([emb] * n_tables),
            }
        )

    from ray.data.aggregate import Count

    return (
        ds.map_batches(fan_out, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(block, batch_format="pandas")
        # a pair found in several tables collapses via native hash agg
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_tables"))
        .select_columns(["id_a", "id_b"])
    )


def incremental_dedup(sf_dir: str) -> rd.Dataset:
    """(doc_id): exact incremental dedup — the docs in the NEW slice of
    the corpus (hash_split's val/test buckets, a stand-in for "today's
    ingest batch") that survive exact-content dedup against the
    ALREADY-INGESTED slice (the train buckets). The production shape:
    each ingest wave is anti-joined against the existing corpus before it
    is admitted, instead of re-deduplicating the whole corpus per wave.

    Scale shape: the old/new split is the stateless affine-hash kernel
    (no shuffle), and the membership test is Ray Data's native
    hash-partitioned ``join(..., "left_anti")`` on the content — each
    side ships each text exactly once into its hash bucket, old-side
    duplicates need no pre-distinct (anti-join semantics absorb them),
    and nothing is broadcast or driver-collected. (At petabyte scale the
    join key would be a 128-bit content digest probed the same way; the
    raw text key here keeps the op collision-proof, matching
    ``exact_dedup``'s guarantee.)
    """
    from raycrawl.pipelines.relops import join_parts
    from raycrawl.pipelines.textops import _SPLIT_ADD, _SPLIT_MUL

    thr_t = 4096 * 80 // 100

    def split(t: pa.Table, keep_old: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * np.uint64(_SPLIT_MUL) + np.uint64(_SPLIT_ADD)
        bucket = (h >> np.uint64(52)).astype(np.int64)
        mask = bucket < thr_t if keep_old else bucket >= thr_t
        return t.filter(pa.array(mask))

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    old = docs.map_batches(
        lambda t: split(t, True).select(["text"]), batch_format="pyarrow"
    )
    new = docs.map_batches(
        lambda t: split(t, False), batch_format="pyarrow"
    )
    return new.join(
        old,
        join_type="left_anti",
        num_partitions=join_parts(),
        on=("text",),
        right_on=("text",),
    ).select_columns(["doc_id"])


def containment_pairs(
    sf_dir: str, k: int = 3, threshold: float = 0.9
) -> rd.Dataset:
    """(id_a, id_b): pairs whose k-shingle CONTAINMENT
    ``|A ∩ B| / min(|A|, |B|)`` is >= threshold — the asymmetric near-dup
    detector Jaccard misses: a short doc embedded verbatim inside a much
    longer one has tiny Jaccard but containment ~1 (the "doc quoted in a
    roundup page" case Lee et al. 2022 call out).

    Candidates come from ONE shuffle keyed by shingle hash (any shared
    shingle makes a candidate — Jaccard's prefix-filter lemma does NOT
    transfer to containment, because the larger set would need a prefix
    sized by its partner's UNKNOWN size; the production refinement is
    size-bucketed partner-aware prefixes). Verification reuses the
    melted single-join exact plan shared with minhash/prefix dedup, with
    the containment predicate."""
    from ray.data.aggregate import Count

    mask = coarse_parts(sf_dir) - 1

    def explode(t: pa.Table) -> pa.Table:
        # vectorized (round 5): the shared Arrow shingle kernel emits the
        # distinct (row, hash) pairs directly — no per-doc Python loop
        srow, h, _ = _shingle_hash_rows(t, k)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "gram": pa.array(h, pa.int64()),
                "doc_id": pa.array(
                    doc_ids[srow] if len(h) else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "part": pa.array(h & mask, pa.int64()),
            }
        )

    def gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # self-join on the gram (pandas C merge, no Python loop over
        # group members), in-partition dedup, and a coarse pair-hash key
        # for the global dedup — a native groupby((id_a, id_b)) costs
        # ~10 s per 0.4M distinct pairs in Ray's aggregate (measured on
        # the jaccard twin), so the dedup is the standard coarse
        # partition + pandas drop_duplicates instead.
        f = g[["gram", "doc_id"]].drop_duplicates()
        m = f.merge(f, on="gram", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = m[["doc_id_a", "doc_id_b"]].drop_duplicates()
        a = out["doc_id_a"].to_numpy(np.int64)
        b = out["doc_id_b"].to_numpy(np.int64)
        return pd.DataFrame(
            {"id_a": a, "id_b": b, "pp": ((a * 1000003) ^ b) & mask}
        )

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b"]]

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    cands = clean_blocks(
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gram_pairs, batch_format="pandas")
        .groupby("pp")
        .map_groups(dedup_pairs, batch_format="pandas"),
        pair_schema,
    )

    def accept(sa: set, sb: set) -> bool:
        lo = min(len(sa), len(sb))
        return bool(lo) and len(sa & sb) / lo >= threshold

    return _verify_jaccard_pairs(cands, sf_dir, k, threshold, mask,
                                 accept=accept)


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-then-prune
# ---------------------------------------------------------------------------


def semdedup(
    sf_dir: str, k: int = 8, threshold: float = 0.3,
    ds: rd.Dataset | None = None, tile: int = 4096,
) -> rd.Dataset:
    """(vec_id, cluster, keep): SemDeDup (Abbas et al. 2023) — semantic
    deduplication by CLUSTERING the embedding space first and pruning
    near-identical pairs only INSIDE each cluster, never across the whole
    corpus. A vector is dropped (keep=0) iff some LOWER-id vector in the
    same k-means cluster has cosine similarity >= ``threshold`` — the
    paper keeps one representative per semantic-duplicate set; min-id is
    the deterministic stand-in for its farthest-from-centroid choice (and
    is what makes the DuckDB twin an EXISTS instead of a greedy loop).

    Plan: the two-round EXACT integer k-means from :func:`ann.kmeans_assign`
    (bit-reproducible in SQL via the unrolled-CTE trick) rides the
    embedding column along to the assignment pass, then ONE
    groupby(cluster) shuffle co-locates each cluster and the per-cluster
    kernel is a dense |C| x |C| float64 similarity matmul (threshold
    COMPARISON only — no float leaves the operator, so value hashes are
    stable).

    Scale shape: the whole point of SemDeDup is that k grows with the
    corpus (the paper runs k ~ 50k on LAION) so |C| ~ N/k stays bounded
    and the |C|^2 block work is constant per cluster; the all-pairs matrix
    the naive approach needs never exists. The shuffle moves each vector
    exactly once, keyed by cluster. Round-5 hardening: the per-cluster
    similarity pass is TILED into <= ``tile`` x ``tile`` chunks, so one
    degenerate k-means cluster (every vector landing in one list) bounds
    peak memory at O(tile^2) instead of materializing an O(|C|^2) score
    matrix — same comparisons, same output."""
    from raycrawl.pipelines.ann import kmeans_assign

    assigned = kmeans_assign(sf_dir, k=k, ds=ds, with_embedding=True)

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy().astype(np.int64)
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        m = m / norms[:, None]
        n = len(ids)
        # column j is dropped iff any i<j clears the threshold — the SQL
        # EXISTS over b.vec_id < a.vec_id — computed in tile x tile
        # chunks of the (implicit) upper triangle
        dropped = np.zeros(n, bool)
        for c0 in range(0, n, tile):
            c1 = min(c0 + tile, n)
            hit = np.zeros(c1 - c0, bool)
            for r0 in range(0, c1, tile):
                r1 = min(r0 + tile, c1)
                sims = m[r0:r1] @ m[c0:c1].T
                lt = (
                    np.arange(r0, r1)[:, None]
                    < np.arange(c0, c1)[None, :]
                )
                hit |= ((sims >= threshold) & lt).any(axis=0)
            dropped[c0:c1] = hit
        return pd.DataFrame(
            {
                "vec_id": pd.array(ids, "int64"),
                "cluster": pd.array(
                    g["cluster"].to_numpy().astype(np.int64), "int64"),
                "keep": pd.array((~dropped).astype(np.int64), "int64"),
            }
        )

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas")


def _byte_mat(arr: pa.Array, reverse: bool = False):
    """(n, Lmax) zero-padded uint8 matrix + int64 lengths for a binary
    array, built by one vectorized gather over the Arrow data buffer (no
    per-row Python). ``reverse=True`` flips each row by its OWN length
    (for suffix-match scans)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.binary())
    off = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, np.uint8) if buf is not None
        else np.zeros(0, np.uint8)
    )
    lens = off[1:] - off[:-1]
    n = len(arr)
    L = int(lens.max()) if n else 0
    if L == 0:
        return np.zeros((n, 0), np.uint8), lens
    pos = np.arange(L, dtype=np.int64)[None, :]
    if reverse:
        idx = off[1:, None] - 1 - pos
        valid = idx >= off[:-1, None]
    else:
        idx = off[:-1, None] + pos
        valid = idx < off[1:, None]
    mat = np.zeros((n, L), np.uint8)
    mat[valid] = data[idx[valid]]
    return mat, lens


def _match_len(ma: np.ndarray, la: np.ndarray, mb: np.ndarray,
               lb: np.ndarray) -> np.ndarray:
    """Per-row length of the common prefix of rows of two byte matrices
    (pass reversed matrices for common-suffix lengths)."""
    L = max(ma.shape[1], mb.shape[1])
    if ma.shape[1] < L:
        ma = np.pad(ma, ((0, 0), (0, L - ma.shape[1])))
    if mb.shape[1] < L:
        mb = np.pad(mb, ((0, 0), (0, L - mb.shape[1])))
    lim = np.minimum(la, lb)
    if L == 0:
        return np.zeros(len(la), np.int64)
    mism = (ma != mb) & (np.arange(L)[None, :] < lim[:, None])
    has = mism.any(axis=1)
    return np.where(has, mism.argmax(axis=1), lim).astype(np.int64)


def edit1_pairs(sf_dir: str, table: str = "customer",
                col: str = "c_name") -> rd.Dataset:
    """(name_a, name_b): every UNORDERED pair of distinct ``col`` values at
    Levenshtein distance <= 1 — record linkage / fuzzy key matching by the
    symmetric-delete blocking of FastSS (Bocek et al. 2007) / SymSpell:
    two strings are within one edit iff they share an element of
    {s} ∪ deletions1(s), so blocking on those keys has PERFECT recall and
    the quadratic all-pairs scan never happens.

    Scale shape: per batch, every deletion variant is built by vectorized
    Arrow slice+join kernels (L+1 keys per string — meant for short key
    columns: names, titles, hosts); candidate groups resolve inside
    coarse-hash partitions (variant-key cardinality scales with the data —
    the native-aggregate cost rule), pairs are globally deduped the same
    way, and the final lev<=1 check is a vectorized prefix/suffix
    match-length pass over byte matrices (equal lengths: p + s >= L - 1;
    lengths off by one: p + s >= min-L) — no per-row DP, no Python loop
    over candidates."""
    from raycrawl.pipelines.relops import _read

    mask = coarse_parts(sf_dir) - 1
    _BIG = 1 << 30

    def variants(t: pa.Table) -> pa.Table:
        s = pc.unique(pc.cast(t[col], pa.binary()))
        if len(s) == 0:
            return pa.table(
                {"vkey": pa.array([], pa.binary()),
                 "name": pa.array([], pa.binary())}
            )
        lens = pc.binary_length(s).to_numpy(zero_copy_only=False)
        keys = [s]
        names = [s]
        for i in range(int(lens.max())):
            sub = pc.filter(s, pa.array(lens > i))
            keys.append(
                pc.binary_join_element_wise(
                    pc.binary_slice(sub, 0, i),
                    pc.binary_slice(sub, i + 1, _BIG),
                    b"",
                )
            )
            names.append(sub)
        tbl = pa.table(
            {
                "vkey": pa.concat_arrays(
                    [k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                     else k for k in keys]
                ),
                "name": pa.concat_arrays(
                    [k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                     else k for k in names]
                ),
            }
        )
        # zero-runs: deleting any char of a same-char run yields the same
        # variant — local dedup keeps one (vkey, name) row
        return tbl.group_by(["vkey", "name"]).aggregate([])

    def add_pp(t: pa.Table) -> pa.Table:
        pp = coarse_key(t.to_pandas(), ["vkey"], mask)
        return t.append_column("pp", pa.array(pp, pa.int64()))

    def pairs_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vkey", kind="mergesort")
        vk = df["vkey"].to_numpy()
        nm = df["name"].to_numpy()
        empty = pd.DataFrame(
            {"name_a": pd.Series([], dtype=object),
             "name_b": pd.Series([], dtype=object)}
        )
        if len(vk) == 0:
            return empty
        new = np.r_[True, vk[1:] != vk[:-1]]
        counts = np.diff(np.r_[np.flatnonzero(new), len(vk)])
        starts = np.cumsum(counts) - counts
        a_out, b_out = [], []
        for st, c in zip(starts[counts > 1], counts[counts > 1]):
            # candidate groups are alphabet-bounded (strings sharing one
            # deletion variant), so the per-group pair expansion is tiny
            ii, jj = np.triu_indices(int(c), 1)
            ga, gb = nm[st + ii], nm[st + jj]
            lo = np.minimum(ga, gb)
            hi = np.maximum(ga, gb)
            a_out.append(lo)
            b_out.append(hi)
        if not a_out:
            return empty
        return pd.DataFrame(
            {"name_a": np.concatenate(a_out),
             "name_b": np.concatenate(b_out)}
        ).drop_duplicates()

    cand = (
        _read(sf_dir, table, [col])
        .map_batches(variants, batch_format="pyarrow")
        .map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(pairs_part, batch_format="pandas")
    )
    # a lev-2 candidate (e.g. a transposition) can share TWO variant keys
    # and surface in two partitions — dedup pairs before the verify
    cand = coarse_distinct(cand, ["name_a", "name_b"], mask)

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"name_a": pa.array([], pa.string()),
                 "name_b": pa.array([], pa.string())}
            )
        a, b = t["name_a"], t["name_b"]
        ma, la = _byte_mat(a)
        mb, lb = _byte_mat(b)
        ra, _ = _byte_mat(a, reverse=True)
        rb, _ = _byte_mat(b, reverse=True)
        p = _match_len(ma, la, mb, lb)
        s = _match_len(ra, la, rb, lb)
        dl = np.abs(la - lb)
        ok = np.where(
            dl == 0,
            p + s >= np.maximum(la - 1, 0),
            (dl == 1) & (p + s >= np.minimum(la, lb)),
        )
        kept = t.filter(pa.array(ok.astype(bool)))
        return pa.table(
            {
                "name_a": pc.cast(kept["name_a"], pa.string()),
                "name_b": pc.cast(kept["name_b"], pa.string()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def dedup_source_stats(sf_dir: str, **cluster_kw) -> rd.Dataset:
    """(source, n_docs, n_dups, dup_ratio_4096): per-SOURCE duplication
    report — what fraction of each source's docs a near-dup dedup pass
    would drop (cluster label != own id). The curation dashboard number
    that decides which feeds get down-weighted or re-scraped: boilerplate
    mills show up as high-dup sources instantly.

    Scale shape: one hash-partitioned join ships (doc_id, cluster_id)
    against the pruned (doc_id, source) read — the only shuffle beyond
    what clustering already did — then per-batch partial counts into a
    source-domain-bounded native aggregate. Ratio in integer 4096ths
    (the repo's no-float contract)."""
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.relops import join_parts

    clusters = clean_blocks(
        dedup_clusters(sf_dir, **cluster_kw),
        pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
    )
    srcs = clean_blocks(
        _read_docs(sf_dir, ["doc_id", "source"]),
        pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
    )

    def partial(t: pa.Table) -> pa.Table:
        dup = pc.cast(
            pc.not_equal(t["doc_id"], t["cluster_id"]), pa.int64()
        )
        g = (
            pa.table({"source": t["source"], "n": pa.array(
                np.ones(len(t), np.int64)), "d": dup})
            .group_by("source")
            .aggregate([("n", "sum"), ("d", "sum")])
        )
        return g.rename_columns(["source", "n", "d"])

    per_src = (
        srcs.join(clusters, join_type="inner",
                  num_partitions=join_parts(), on=("doc_id",),
                  right_on=("doc_id",))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"),
                   Sum("d", alias_name="n_dups"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t["source"],
                "n_docs": t["n_docs"],
                "n_dups": t["n_dups"],
                "dup_ratio_4096": pc.divide(
                    pc.multiply(t["n_dups"], 4096), t["n_docs"]
                ),
            }
        )

    return per_src.map_batches(finish, batch_format="pyarrow")
