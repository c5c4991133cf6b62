"""Text-analysis operators over a documents table (training-data pipeline).

Beyond-the-reference operators a large-scale text pipeline needs (prompt
spec): token counting, quality scoring, language-ID, document
fingerprinting. All are single-pass ``map_batches`` stages: stateless ones
run as Ray tasks on zero-copy Arrow batches with pyarrow.compute kernels;
the language-ID model (compiled stopword tables) is a callable class =
actor pool, loaded once per actor.

Integer-only outputs where a DuckDB oracle exists (float aggregate hashes
are representation-fragile; see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from raycrawl.pipelines.relops import join_parts, pool_size

__all__ = [
    "vocab_topk",
    "bigrams_topk",
    "heavy_tokens",
    "top_docs_per_lang",
    "token_stats",
    "bpe_token_counts",
    "stopword_stats",
    "repetition_stats",
    "decontaminate",
    "hash_split",
    "stratified_sample",
    "curation",
    "quality_stats",
    "quality_label",
    "clean_text",
    "lang_counts",
    "langid",
    "fingerprints",
    "LangId",
    "segment_dedup",
    "common_token_ratio",
    "length_pctile",
    "cooccur_topk",
    "pmi_topk",
    "bpe_train",
    "feature_hash",
    "scrub",
    "pack_manifest",
    "oov_rate",
    "dsir_weights",
    "fluency",
    "shuffle_shards",
    "boilerplate_strip",
    "prepare",
    "ttr",
    "readability",
    "pii_scrub",
    "mix_upsample",
    "code_score",
    "bpe_encode",
    "hash_sample",
    "vocab_growth",
    "lang_source_drift",
    "langid_confusion",
    "doc_chunks",
]


def _read_docs(sf_dir: str, columns):
    import os

    from raycrawl.pipelines.dedup import doc_blocks

    # size-derived block count: small documents tables stay cheap to
    # shuffle (floor 8), large corpora spread (~32 MB/block — see
    # dedup.doc_blocks)
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=columns,
        override_num_blocks=doc_blocks(sf_dir),
    )


def token_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, text_len): whitespace-token count + char length.

    n_tokens counts non-overlapping ``\\S+`` matches — matches DuckDB's
    ``length(regexp_extract_all(text, '\\S+'))`` exactly.
    """

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
                "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


# GPT-2-style pre-tokenizer, RE2-compatible (no lookahead — pyarrow and
# DuckDB both run RE2, so the oracle reproduces counts exactly):
# contractions | space-prefixed letter runs | digit runs | punct runs | ws
BPE_SPLIT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bpe_tokens): BPE-ish pre-tokenizer match count — the
    token-budget estimator of a training-data pipeline, fully vectorized
    (one pyarrow RE2 kernel per batch, no Python loop)."""

    def count(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(t["text"], BPE_SPLIT), pa.int64()
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow"
    )


def quality_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_words, n_punct, n_nonspace): quality-score raw features.

    Integer features only; a downstream scorer thresholds them. Vectorized
    pyarrow regex kernels — no Python loop.
    """

    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
                "n_punct": pc.cast(
                    pc.count_substring_regex(t["text"], r"[.,!?;:]"), pa.int64()
                ),
                "n_nonspace": pc.cast(
                    pc.count_substring_regex(t["text"], r"\S"), pa.int64()
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


# the quality-scoring stopword list (reused by the langid 'en' table)
_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def stopword_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_words, n_stopwords): stopword-hit counts (with
    multiplicity) — the numerator/denominator of the stopword-ratio
    quality signal (a near-zero ratio flags non-prose/gibberish docs).

    Fully vectorized: one RE2 split + one is_in over the flattened token
    array + a prefix-sum segmented count per row (no Python loop; RE2 has
    no lookahead, so word-boundary regex counting is not an option)."""
    import numpy as np

    def stats(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t["text"])
        lists = pc.split_pattern_regex(lower, r"\s+").combine_chunks()
        hits = (
            pc.is_in(lists.flatten(), value_set=pa.array(list(_EN_STOPWORDS)))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        offs = lists.offsets.to_numpy()
        cs = np.concatenate([[0], np.cumsum(hits)])
        per_row = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pc.cast(
                    pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
                ),
                "n_stopwords": pa.array(per_row, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def _flat_tokens(t: pa.Table):
    """Flatten the batch's texts into (tokens, row_ids): lower + \\s+ split,
    empties dropped — THE tokenization every n-gram op (repetition,
    decontaminate) and its oracle share."""
    import numpy as np

    toks = pc.split_pattern_regex(
        pc.utf8_lower(t["text"]), r"\s+"
    ).combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy()
    trow = np.repeat(np.arange(len(t)), np.diff(offs))
    keep = flat != ""
    return flat[keep], trow[keep]


def _shingles(flat, trow, n: int):
    """n-token shingle strings + their row ids, vectorized: n shifted
    slices joined element-wise by pyarrow (one C pass), windows that cross
    a row boundary masked out. No Python loop over positions."""
    import numpy as np

    m = len(flat) - n + 1
    if m <= 0:
        return np.empty(0, object), np.empty(0, np.int64)
    ok = trow[:m] == trow[n - 1 :]
    parts = [pa.array(flat[k : m + k], pa.string()) for k in range(n)]
    joined = pc.binary_join_element_wise(*parts, " ")
    return joined.to_numpy(zero_copy_only=False)[ok], trow[:m][ok]


def _ngram_per_row(grow, gid, n_rows):
    """totals, distincts, per-row max multiplicity for (row, gram-id)."""
    import numpy as np
    import pandas as pd

    total = np.bincount(grow, minlength=n_rows)
    if len(gid):
        gc, _ = pd.factorize(gid)
        key = grow.astype(np.int64) * (gc.max() + 1) + gc
        uk, uc = np.unique(key, return_counts=True)
        urow = (uk // (gc.max() + 1)).astype(np.int64)
        distinct = np.bincount(urow, minlength=n_rows)
        top = np.zeros(n_rows, np.int64)
        np.maximum.at(top, urow, uc)
    else:
        distinct = np.zeros(n_rows, np.int64)
        top = np.zeros(n_rows, np.int64)
    return total.astype(np.int64), distinct, top


def _repetition_batch(t: pa.Table) -> pa.Table:
    """The repetition_stats map_batches kernel (module-level so the
    hypothesis differential test can drive it on in-memory tables)."""
    import numpy as np
    import pandas as pd

    n = len(t)
    flat, trow = _flat_tokens(t)

    codes, _ = pd.factorize(flat)
    codes = codes.astype(np.int64)
    k_voc = codes.max() + 1 if len(codes) else 1

    # bigram ids at EVERY adjacent token position (cross-row boundary
    # positions yield garbage ids that the adj masks drop; keeping the
    # array position-aligned is what lets the trigram step reuse it)
    adj2 = trow[1:] == trow[:-1] if len(trow) else np.empty(0, bool)
    b_full = (
        codes[:-1] * k_voc + codes[1:] if len(codes) else np.empty(0, np.int64)
    )
    n_bi, d_bi, top_bi = _ngram_per_row(trow[:-1][adj2], b_full[adj2], n)

    if len(trow) > 2:
        adj3 = trow[2:] == trow[:-2]
        t_row = trow[:-2][adj3]
        # factorized bigram (i,i+1) composed with token i+2 — both arrays
        # indexed by token position i, so the mask aligns
        bc_full = pd.factorize(b_full)[0].astype(np.int64)
        t_id = bc_full[:-1][adj3] * k_voc + codes[2:][adj3]
    else:
        t_row = np.empty(0, np.int64)
        t_id = np.empty(0, np.int64)
    n_tri, _, top_tri = _ngram_per_row(t_row, t_id, n)

    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_bigrams": pa.array(n_bi, pa.int64()),
            "n_dup_bigrams": pa.array(n_bi - d_bi, pa.int64()),
            "top_bigram_n": pa.array(top_bi, pa.int64()),
            "n_trigrams": pa.array(n_tri, pa.int64()),
            "top_trigram_n": pa.array(top_tri, pa.int64()),
        }
    )


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bigrams, n_dup_bigrams, top_bigram_n, n_trigrams,
    top_trigram_n): Gopher-style repetition quality signals — the
    top-n-gram fraction and duplicate-n-gram fraction numerators and
    denominators (integer-only; a downstream filter thresholds the ratios,
    e.g. drop docs where top_bigram_n/n_bigrams > 0.2).

    Single-pass map_batches, fully vectorized: one RE2 split per batch,
    then token-code factorization (pandas C) and n-gram ids built by
    integer composition of adjacent codes — no string concatenation, no
    Python loop. Per-row totals/distincts/maxima come from np.unique +
    bincount over (row, gram-id) keys. Trigram ids compose the FACTORIZED
    bigram id with the third token code so the key space stays
    ~(tokens/batch)^2 — no K^3 overflow at any realistic batch vocab.
    """
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow"
    )


def _eval_gram_ref(sf_dir: str, n: int, eval_mod: int):
    """Distinct n-token shingles of the eval subset, as a ray.put'd sorted
    numpy array. Per-batch distinct reduce -> one driver collect bounded by
    the (benchmark-sized) eval corpus, never the training corpus."""
    import numpy as np

    def eval_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.take(np.flatnonzero(ids % eval_mod == 0))
        g, _ = _shingles(*_flat_tokens(sub), n)
        return pa.table({"g": pa.array(np.unique(g), pa.string())})

    ev_batches = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(eval_grams, batch_format="pyarrow")
        .to_pandas()  # bounded: distinct grams of the (small) eval set
    )
    return ray.put(np.unique(ev_batches["g"].to_numpy()))


def decontaminate(sf_dir: str, n: int = 3, eval_mod: int = 97) -> rd.Dataset:
    """(doc_id, contaminated): benchmark-decontamination flag — a non-eval
    doc is contaminated iff it shares ANY n-token shingle with the eval
    subset (docs where doc_id % eval_mod == 0 stand in for a benchmark
    suite; real pipelines pass the actual eval corpus). Production n is
    8-13; the query uses n=3 because the synthetic corpus has ~50-token
    docs over a small vocabulary.

    Scale shape: the eval side is SMALL BY DEFINITION (a benchmark suite,
    not the corpus), so it is the broadcast side — distinct eval shingles
    are reduced per-batch, collected once on the driver (bounded by the
    eval corpus, never the training corpus), and shipped via ray.put.
    (Because the stand-in eval set lives inside the same table, building
    it costs one extra corpus scan here; with a real benchmark file the
    gram build reads only that small file.) The
    corpus-side pass is an actor-pool map_batches: each actor builds ONE
    pandas hash index over the eval grams in __init__ and probes each
    batch's shingles at C speed (O(batch), never O(eval) per batch — the
    fetchsim/VERDICT-r2 index-once rule). Shingle construction is one
    element-wise pyarrow join over n shifted token slices; per-row "any
    hit" is a bincount. No shuffle anywhere.
    """
    import numpy as np

    ev_ref = _eval_gram_ref(sf_dir, n, eval_mod)

    class Decontaminate:
        def __init__(self):
            import pandas as pd

            # one object-store read + ONE hash index per actor
            self.idx = pd.Index(ray.get(ev_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            sub = t.take(np.flatnonzero(ids % eval_mod != 0))
            g, grow = _shingles(*_flat_tokens(sub), n)
            hit = self.idx.get_indexer(g) >= 0
            bad = np.bincount(grow[hit], minlength=len(sub)) > 0
            return pa.table(
                {
                    "doc_id": sub["doc_id"],
                    "contaminated": pa.array(bad.astype(np.int64), pa.int64()),
                }
            )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Decontaminate, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
    )


def _bloom_positions(grams, m_bits: int, j: int):
    """(len(grams), j) int64 bit positions via Kirsch-Mitzenmacher double
    hashing of TWO independent vectorized 64-bit gram hashes
    (pd.util.hash_array under two different siphash keys — deterministic,
    C-speed, no per-string Python).

    h2 must NOT be an arithmetic mix of h1: with m a power of two, the low
    bits of h1*C+D depend only on the low bits of h1, so every probe
    position would be a function of h1 mod m and the filter degenerates to
    a SINGLE-hash bloom (measured: FP rate n_eval/2**20 per gram instead
    of (bits/m)**j — the bug this comment commemorates)."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(grams, dtype=object)
    h1 = pd.util.hash_array(arr)
    h2 = pd.util.hash_array(arr, hash_key="raycrawl_bloom_2")
    # force h2 odd so the double-hash probe sequence never degenerates
    h2 |= np.uint64(1)
    i = np.arange(j, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def decontaminate_bloom(sf_dir: str, n: int = 3, eval_mod: int = 97,
                        m_bits: int = 1 << 20, j: int = 4) -> rd.Dataset:
    """(doc_id, contaminated): Bloom-filter decontamination — the sketch
    path for when the distinct eval-shingle set is too large to broadcast
    raw (a full benchmark union at production scale). ZERO false negatives
    by construction (every true shingle hit sets all its bits); a bounded
    false-positive rate can flag extra docs, checked at query time against
    the exact broadcast-set result (__ray_entry__._decontaminate_bloom_checked).

    Scale shape: the filter is built DISTRIBUTED — each batch ORs its
    eval shingles into a local m-bit bitmap and the driver ORs the
    ≤nblocks bitmaps (each m/8 bytes, bounded by the filter size, never by
    the eval corpus) — then ships one ray.put bitmap to an actor pool that
    probes each batch's shingles with two vectorized hash mixes (double
    hashing, no per-string Python). Memory is m bits per actor regardless
    of eval size — vs the exact path's full gram index.
    """
    import numpy as np

    def eval_bits(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.take(np.flatnonzero(ids % eval_mod == 0))
        bits = np.zeros(m_bits, dtype=bool)
        g, _ = _shingles(*_flat_tokens(sub), n)
        if len(g):
            bits[_bloom_positions(np.unique(g), m_bits, j).ravel()] = True
        return pa.table({"bitmap": pa.array([np.packbits(bits).tobytes()],
                                            pa.binary())})

    packed = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(eval_bits, batch_format="pyarrow")
        .take_all()  # ≤nblocks bitmaps of m/8 bytes each — bounded by m
    )
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in packed:
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    bits_ref = ray.put(np.unpackbits(merged).astype(bool))

    class Probe:
        def __init__(self):
            # one object-store read per actor; m bits of state total
            self.bits = ray.get(bits_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            sub = t.take(np.flatnonzero(ids % eval_mod != 0))
            g, grow = _shingles(*_flat_tokens(sub), n)
            if len(g):
                hit = self.bits[_bloom_positions(g, m_bits, j)].all(axis=1)
                bad = np.bincount(grow[hit], minlength=len(sub)) > 0
            else:
                bad = np.zeros(sub.num_rows, dtype=bool)
            return pa.table(
                {
                    "doc_id": sub["doc_id"],
                    "contaminated": pa.array(bad.astype(np.int64), pa.int64()),
                }
            )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Probe, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
    )


# odd 64-bit constants (golden-ratio / Pelle Evensen mixers); ids map
# through a mod-2^64 affine hash whose top 12 bits pick the bucket —
# numpy uint64 wraps natively, DuckDB reproduces it in HUGEINT
_SPLIT_MUL = 0x9E3779B97F4A7C15
_SPLIT_ADD = 0xD1B54A32D192ED03


def hash_split(
    sf_dir: str, pct_train: int = 80, pct_val: int = 10
) -> rd.Dataset:
    """(doc_id, bucket, split): deterministic train/val/test assignment by
    content-independent id hash — the split every training pipeline needs,
    stable under re-runs, resharding and corpus growth (a doc's split
    never changes when other docs are added or the job is re-partitioned,
    unlike random_shuffle + slice). Embarrassingly parallel: a stateless
    map_batches with a 3-op numpy uint64 kernel per batch; no shuffle, no
    state, no driver work. bucket (0..4095) is exposed so downstream
    samplers can sub-slice ("every doc in buckets 0-40" == a deterministic
    1% sample) without rehashing.
    """
    import numpy as np

    thr_t = 4096 * pct_train // 100
    thr_v = 4096 * (pct_train + pct_val) // 100

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * np.uint64(_SPLIT_MUL) + np.uint64(_SPLIT_ADD)
        bucket = (h >> np.uint64(52)).astype(np.int64)
        split = np.where(
            bucket < thr_t, "train", np.where(bucket < thr_v, "val", "test")
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bucket": pa.array(bucket, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


# independent draw from hash_split: different odd mixer constants
# (xxhash64 primes — public), so sampling never correlates with the
# train/val/test assignment
_SAMPLE_MUL = 0xC2B2AE3D27D4EB4F
_SAMPLE_ADD = 0x165667B19E3779F9

# per-language keep-rates in 4096ths (the data-mixing knob: upsample the
# scarce languages, downsample the dominant one)
SAMPLE_RATES_4096 = {
    "en": 1024,   # 25%
    "zh": 3072,   # 75%
    "es": 3072,
    "de": 2048,   # 50%
    "fr": 2048,
}


def stratified_sample(sf_dir: str) -> rd.Dataset:
    """(doc_id, lang): deterministic per-language (stratified) sample —
    doc kept iff the top 12 bits of an id affine hash fall under its
    language's keep-rate. The language-rebalancing draw of a data-mixing
    recipe, with hash_split's stability guarantees (a doc's fate never
    changes under resharding or corpus growth) via an INDEPENDENT mixer.

    Embarrassingly parallel: a stateless map_batches, one numpy uint64
    affine op + a rate lookup per batch; no shuffle, no state. Unknown
    languages are dropped (rate 0)."""
    import numpy as np

    langs = list(SAMPLE_RATES_4096)
    thr = {l: SAMPLE_RATES_4096[l] for l in langs}

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * np.uint64(_SAMPLE_MUL) + np.uint64(_SAMPLE_ADD)
        bucket = (h >> np.uint64(52)).astype(np.int64)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        limit = np.zeros(len(t), np.int64)
        for l, v in thr.items():  # |langs| vectorized passes, not per-row
            limit[lang == l] = v
        keep = np.flatnonzero(bucket < limit)
        return pa.table({"doc_id": t["doc_id"].take(keep),
                         "lang": t["lang"].take(keep)})

    return _read_docs(sf_dir, ["doc_id", "lang"]).map_batches(
        pick, batch_format="pyarrow"
    )


def curation(
    sf_dir: str,
    n: int = 3,
    eval_mod: int = 97,
    min_words: int = 20,
    max_words: int = 2000,
    rep_max_pct: int = 20,
    pct_train: int = 80,
    pct_val: int = 10,
) -> rd.Dataset:
    """(doc_id, n_tokens, q_ok, rep_ok, uncontaminated, survivor, split,
    keep): the full end-to-end curation decision — the flagship
    training-data pipeline composed from this module's signals. A doc is
    kept iff it passes the length gate, its top-bigram fraction is at most
    rep_max_pct %, it shares no n-gram with the eval set, and it is the
    canonical doc of its near-dup cluster. `split` rides along so the kept
    corpus is already train/val/test partitioned.

    Scale shape: FOUR signals (length, repetition, contamination, split)
    come from ONE fused actor-pool map_batches over one corpus read — one
    tokenization amortized across all of them, the eval-gram index held per
    actor. The only shuffle in the whole pipeline is what dedup itself
    needs: the survivor flag arrives by a hash-partitioned left join
    against :func:`dedup.dedup_survivors` (corpus-sized on both sides, so a
    broadcast is not an option).
    """
    import numpy as np

    from raycrawl.pipelines.dedup import clean_blocks, dedup_survivors

    thr_t = 4096 * pct_train // 100
    thr_v = 4096 * (pct_train + pct_val) // 100
    ev_ref = _eval_gram_ref(sf_dir, n, eval_mod)

    class Curate:
        def __init__(self):
            import pandas as pd

            self.idx = pd.Index(ray.get(ev_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            ids_all = t["doc_id"].to_numpy(zero_copy_only=False)
            sub = t.take(np.flatnonzero(ids_all % eval_mod != 0))
            m = len(sub)
            flat, trow = _flat_tokens(sub)
            n_tok = np.bincount(trow, minlength=m).astype(np.int64)
            q_ok = (n_tok >= min_words) & (n_tok <= max_words)
            g2, grow2 = _shingles(flat, trow, 2)
            n_bi, _, top_bi = _ngram_per_row(grow2, g2, m)
            rep_ok = (n_bi == 0) | (top_bi * 100 <= rep_max_pct * n_bi)
            gq, growq = _shingles(flat, trow, n)
            hit = self.idx.get_indexer(gq) >= 0
            unc = np.bincount(growq[hit], minlength=m) == 0
            ids = sub["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.uint64
            )
            h = ids * np.uint64(_SPLIT_MUL) + np.uint64(_SPLIT_ADD)
            bucket = (h >> np.uint64(52)).astype(np.int64)
            split = np.where(
                bucket < thr_t,
                "train",
                np.where(bucket < thr_v, "val", "test"),
            )
            return pa.table(
                {
                    "doc_id": sub["doc_id"],
                    "n_tokens": pa.array(n_tok, pa.int64()),
                    "q_ok": pa.array(q_ok.astype(np.int64), pa.int64()),
                    "rep_ok": pa.array(rep_ok.astype(np.int64), pa.int64()),
                    "uncontaminated": pa.array(
                        unc.astype(np.int64), pa.int64()
                    ),
                    "split": pa.array(split, pa.string()),
                }
            )

    # 0.5-CPU actors: the downstream hash-shuffle join spawns aggregator
    # actors that reserve whole CPUs — full-CPU signal actors deadlock the
    # pipeline on small (4-CPU) clusters (same reservation-starvation class
    # as the crawl fetch actors, BASELINE.md round-2)
    # clean_blocks: on small corpora some read blocks are empty; empty
    # blocks BYPASS the map_batches UDF, stay schema-less, and kill the
    # join ("No match for key field reference" — the round-2 sharp edge)
    signals = clean_blocks(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            Curate, batch_format="pyarrow", concurrency=pool_size(), num_cpus=0.5
        ),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_tokens", pa.int64()),
                ("q_ok", pa.int64()),
                ("rep_ok", pa.int64()),
                ("uncontaminated", pa.int64()),
                ("split", pa.string()),
            ]
        ),
    )

    def mark(t: pa.Table) -> pa.Table:
        one = np.ones(len(t), np.int64)
        return pa.table({"doc_id": t["doc_id"], "survivor": pa.array(one)})

    surv = clean_blocks(
        dedup_survivors(sf_dir),
        pa.schema([("doc_id", pa.int64())]),
    ).map_batches(mark, batch_format="pyarrow")

    joined = signals.join(
        surv,
        join_type="left_outer",
        num_partitions=join_parts(),
        on=("doc_id",),
    )

    def finish(t: pa.Table) -> pa.Table:
        surv_col = pc.fill_null(t["survivor"], 0)
        keep = pc.multiply(
            pc.multiply(t["q_ok"], t["rep_ok"]),
            pc.multiply(t["uncontaminated"], surv_col),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "q_ok": t["q_ok"],
                "rep_ok": t["rep_ok"],
                "uncontaminated": t["uncontaminated"],
                "survivor": surv_col,
                "split": t["split"],
                "keep": keep,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def vocab_topk(sf_dir: str, k: int = 50) -> rd.Dataset:
    """(token, n): top-k corpus vocabulary — the canonical explode+aggregate
    (wordcount). Per-batch: vectorized token explode (pyarrow
    extract_all + flatten, no python loop) and a PARTIAL count, so the
    shuffle moves one row per distinct (batch, token), not one per token
    occurrence. Deterministic tie-break (n desc, token asc)."""

    def explode_count(t: pa.Table) -> pa.Table:
        # split on whitespace + drop empties == \S+ token extraction
        lists = pc.split_pattern_regex(t["text"], r"\s+")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [("token", "count")]
        )
        return g.rename_columns(["token", "n"])

    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    return (
        coarse_sum(
            _read_docs(sf_dir, ["text"])
            .map_batches(explode_count, batch_format="pyarrow"),
            ["token"], ["n"], coarse_parts(sf_dir) - 1,
        )
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def bigrams_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """(gram, n): top-k corpus bigrams — the n-gram language-model count
    table every data-mixing recipe reads off first. Tokenization is
    :func:`_flat_tokens` (lower + \\s+ split, the shared contract with the
    repetition/decontamination oracles); bigrams never cross a document
    boundary.

    Scale shape: the shingle explode is the vectorized cross-row shift
    (`_shingles`, one pyarrow binary_join pass per batch) and the counts
    are PARTIAL per batch before the one shuffle — the groupby moves one
    row per distinct (batch, gram), not one per occurrence. Deterministic
    (n desc, gram asc) tie-break."""
    import numpy as np

    from ray.data.aggregate import Sum

    def explode_count(t: pa.Table) -> pa.Table:
        g, _ = _shingles(*_flat_tokens(t), 2)
        if not len(g):
            return pa.table(
                {"gram": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        grams, counts = np.unique(g, return_counts=True)
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    ds = (
        coarse_sum(
            _read_docs(sf_dir, ["text"])
            .map_batches(explode_count, batch_format="pyarrow"),
            ["gram"], ["n"], coarse_parts(sf_dir) - 1,
        )
        .sort(["n", "gram"], descending=[True, False])
        .limit(k)
    )
    # materialize the <= k result rows as a TYPED table: a gram-free
    # corpus leaves schema-less empty blocks after the groupby, and even
    # from_arrow(empty_table).to_pandas() drops columns (Ray 2.49 sharp
    # edges) — collecting k rows is O(k), not a corpus materialization
    schema = pa.schema([("gram", pa.string()), ("n", pa.int64())])
    tbls = [
        b.select(schema.names)
        for b in ray.get(ds.to_arrow_refs())
        if b.num_rows
    ]
    if not tbls:
        return schema.empty_table()
    return pa.concat_tables(tbls).combine_chunks().cast(schema)


def heavy_tokens(sf_dir: str, k: int = 200) -> pa.Table:
    """(token, n): EXACT heavy hitters — every token whose corpus count
    strictly exceeds N/k (N = total token count), via the two-pass
    Misra-Gries candidate sweep. Tokenization is :func:`_flat_tokens`.

    Why not vocab_topk's plan: a full wordcount shuffles one row per
    distinct (batch, token) — at web scale the token domain is huge and
    almost all of it is irrelevant to the > N/k question. Here pass 1
    ships at most k+1 rows per batch (each batch's MG(k)-compressed
    summary: exact batch counts, decremented by the (k+1)-th largest and
    dropped at <= 0 — any token with global count > N/k must survive in
    >= 1 batch, since sum(f_i) > N/k forces some f_i > N_i/k >= the
    batch's decrement). Pass 2 broadcasts the candidate union (bounded by
    (k+1) x n_batches) and exact-counts ONLY candidates; its shuffle is
    candidate-domain-sized. Both passes stream; the driver holds just the
    candidate list and the final <= |candidates| rows."""
    import numpy as np

    import ray

    def mg_candidates(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t)
        if not len(flat):
            return pa.table({"token": pa.array([], pa.string())})
        toks, counts = np.unique(flat, return_counts=True)
        if len(toks) > k:
            d = np.partition(counts, -(k + 1))[-(k + 1)]
            toks = toks[counts > d]
        return pa.table({"token": pa.array(toks, pa.string())})

    cand = (
        _read_docs(sf_dir, ["text"])
        .map_batches(mg_candidates, batch_format="pyarrow")
        .unique("token")
    )
    # a token-free corpus yields None (Ray's unique over zero rows)
    cand = [c for c in (cand or []) if c is not None]
    if not cand:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    cand_ref = ray.put(np.array(sorted(cand), dtype=object))

    class CountCandidates:
        def __init__(self):
            import pandas as pd

            self.idx = pd.Index(ray.get(cand_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, _ = _flat_tokens(t)
            n_tok = len(flat)
            hits = np.zeros(len(self.idx), np.int64)
            if n_tok:
                pos = self.idx.get_indexer(flat)
                np.add.at(hits, pos[pos >= 0], 1)
            nz = np.flatnonzero(hits)
            # the "" row (never a token: empties are dropped) rides the
            # batch's total-token count to the same tiny groupby
            return pa.table(
                {
                    "token": pa.array(
                        np.concatenate((self.idx.values[nz], [""])),
                        pa.string(),
                    ),
                    "n": pa.array(
                        np.concatenate((hits[nz], [n_tok])), pa.int64()
                    ),
                }
            )

    from ray.data.aggregate import Sum

    counts = pa.Table.from_pandas(
        _read_docs(sf_dir, ["text"])
        .map_batches(CountCandidates, batch_format="pyarrow",
                     concurrency=pool_size(), num_cpus=1)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas(),
        preserve_index=False,
    )
    total = pc.sum(
        counts.filter(pc.equal(counts["token"], ""))["n"]
    ).as_py() or 0
    body = counts.filter(pc.not_equal(counts["token"], ""))
    heavy = body.filter(
        pc.greater(pc.multiply(body["n"], k), pa.scalar(total, pa.int64()))
    )
    return heavy.sort_by([("n", "descending"), ("token", "ascending")])


def top_docs_per_lang(sf_dir: str, k: int = 3) -> rd.Dataset:
    """(doc_id, lang, n_chars): top-k documents per language by
    (n_chars desc, doc_id asc) — the "keep best N per group" curation op
    of a training-data pipeline (e.g. best docs per domain/language).

    Scale shape: every batch is pruned to <=k candidate rows per lang
    BEFORE the shuffle (a batch can contribute at most k winners), so the
    groupby moves O(langs * k * n_batches) rows — never the corpus — and
    the per-group finalist pick is the same C-speed sort+head. Both
    passes are one pandas sort_values + groupby().head, no per-row loop.
    """
    import pandas as pd

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .groupby("lang", sort=False)
            .head(k)
        )

    return (
        _read_docs(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(prune, batch_format="pandas")
        .groupby("lang")
        .map_groups(prune, batch_format="pandas")
    )


def quality_label(sf_dir: str, min_words: int = 20, max_words: int = 2000) -> rd.Dataset:
    """(doc_id, label): keep/short/long quality gate — the filter stage of a
    training-data pipeline, expressed so a SQL CASE reproduces it exactly."""

    def lab(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], r"\S+")
        label = pc.if_else(
            pc.less(n, min_words),
            pa.scalar("short"),
            pc.if_else(pc.greater(n, max_words), pa.scalar("long"),
                       pa.scalar("keep")),
        )
        return pa.table({"doc_id": t["doc_id"], "label": label})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        lab, batch_format="pyarrow"
    )


def clean_text(sf_dir: str) -> rd.Dataset:
    """(doc_id, clean): lowercase + whitespace-collapsed + trimmed text —
    the normalization map of a text pipeline, fully vectorized (pyarrow
    utf8 kernels, no python loop)."""

    def clean(t: pa.Table) -> pa.Table:
        c = pc.utf8_lower(t["text"])
        c = pc.replace_substring_regex(c, r"\s+", " ")
        c = pc.utf8_trim_whitespace(c)
        return pa.table({"doc_id": t["doc_id"], "clean": c})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        clean, batch_format="pyarrow"
    )


def lang_counts(sf_dir: str) -> rd.Dataset:
    """(lang, n_docs, total_chars): grouped aggregate with per-batch partial
    pre-aggregation, so the shuffle moves one row per (batch, lang) instead
    of every document (SURVEY aggregation-at-scale pattern)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate(
            [("doc_id", "count"), ("text_len", "sum")]
        )
        return g.rename_columns(["lang", "n_docs", "total_chars"])

    def add_len(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "doc_id": t["doc_id"],
                "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    ds = (
        _read_docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(add_len, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
    )
    out = ds.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_chars", alias_name="total_chars"),
    )
    return out


# deliberately tiny, deterministic stopword tables: a real deployment loads
# fasttext-style models here — the actor-pool shape is identical
_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un", "une"},
    "es": {"el", "la", "los", "y", "es", "un", "una"},
    "zh": set(),
}


class LangId:
    """Actor-pool language-ID stage: stopword/char-ngram heuristic.

    State (stopword value arrays, in scoring order) builds once per actor
    in __init__; __call__ scores a whole batch with ONE utf8_lower +
    split_pattern_regex pass and one index_in probe per language — no
    per-row Python. Score = |distinct tokens ∩ stopwords(lang)|; the
    winner is the max score with ties to the lexicographically first
    language, 'en' when no evidence (exactly the semantics of the scalar
    reference loop, kept as the differential-test twin in
    tests/test_ops.py). A real fasttext-style model drops into the same
    batched shape.
    """

    # tokens = maximal runs of this class, i.e. split on its complement
    _SPLIT = r"[^a-zA-ZÀ-ɏ]+"

    def __init__(self):
        self.langs = sorted(k for k, v in _STOPWORDS.items() if v)
        self.tables = [pa.array(sorted(_STOPWORDS[k])) for k in self.langs]
        self.sizes = [len(a) for a in self.tables]
        self.lang_arr = np.array(self.langs, dtype=object)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            fields = [("doc_id", pa.int64()), ("lang_pred", pa.string())]
            if "lang" in t.column_names:
                fields.append(("lang", pa.string()))
            return pa.schema(fields).empty_table()
        low = pc.utf8_lower(pc.fill_null(t["text"], ""))
        toks = pc.split_pattern_regex(low, self._SPLIT)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

        scores = np.zeros((n, len(self.langs)), np.int64)
        for li, (varr, k) in enumerate(zip(self.tables, self.sizes)):
            widx = pc.index_in(flat, value_set=varr)
            w = widx.to_numpy(zero_copy_only=False).astype(np.float64)
            hit = ~np.isnan(w)
            if not hit.any():
                continue
            # distinct (doc, stopword) pairs -> per-doc DISTINCT-match count
            keys = np.unique(doc_idx[hit] * k + w[hit].astype(np.int64))
            scores[:, li] = np.bincount(keys // k, minlength=n)

        best_n = scores.max(axis=1)
        best = self.lang_arr[scores.argmax(axis=1)]  # first max == sorted tie-break
        preds = np.where(best_n > 0, best, "en")
        cols = {"doc_id": t["doc_id"], "lang_pred": pa.array(preds, pa.string())}
        if "lang" in t.column_names:  # declared-lang passthrough (confusion)
            cols["lang"] = t["lang"]
        return pa.table(cols)


def langid(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=pool_size(), num_cpus=1
    )


def langid_confusion(sf_dir: str) -> rd.Dataset:
    """(lang, lang_pred, n_docs): declared-vs-predicted language
    cross-tab — the ingest audit that catches a feed whose metadata
    disagrees with its content (the off-diagonal mass). Rides the same
    LangId actor pool with the declared column passed through; counts
    are per-batch partials into a (langs x langs)-domain-bounded native
    aggregate — the drift-audit plan of lang_source_drift."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["lang", "lang_pred"])
            .append_column(
                "n", pa.array(np.ones(t.num_rows, np.int64), pa.int64())
            )
            .group_by(["lang", "lang_pred"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["lang", "lang_pred", "n_docs"])

    return (
        _read_docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(
            LangId, batch_format="pyarrow", concurrency=pool_size(),
            num_cpus=1,
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def doc_chunks(
    sf_dir: str, window: int = 64, stride: int = 48
) -> rd.Dataset:
    """(doc_id, chunk_id, pos, n_tokens, chunk_hash): overlapping
    token-window CHUNKING — the retrieval/RAG indexing step (and the
    long-doc splitting step before embedding): windows of ``window``
    tokens starting every ``stride`` tokens (tail windows shorter), one
    row per chunk, chunk_hash = md5 of the space-joined chunk text so
    chunk content is verifiable (and dedupable) without shipping it.

    Scale shape: stateless per-batch kernel, no shuffle — tokens flatten
    ONCE per batch (the shared \\S+ contract), every chunk's token span
    is a gather into one rebuilt ListArray + ONE vectorized binary_join
    (no Python loop over chunks for the text), md5 per chunk (C call,
    ~tokens/stride calls per batch). Chunk count and byte volume scale
    linearly with the corpus; the op emits ~1/stride rows per token."""
    def chunk(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_id", pa.int64()), ("chunk_id", pa.int64()),
             ("pos", pa.int64()), ("n_tokens", pa.int64()),
             ("chunk_hash", pa.string())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(pc.fill_null(t["text"], ""), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat_arr = toks.flatten()
        offs = toks.offsets.to_numpy()
        trow = np.repeat(np.arange(t.num_rows), np.diff(offs))
        ne = pc.not_equal(
            pc.binary_length(flat_arr), 0
        ).to_numpy(zero_copy_only=False)
        if not ne.all():
            flat_arr = flat_arr.filter(pa.array(ne))
            trow = trow[ne]
        cnt = np.bincount(trow, minlength=t.num_rows).astype(np.int64)
        starts = np.cumsum(cnt) - cnt
        n_chunks = -(-cnt // stride)  # ceil(n/stride); 0 for empty docs
        if int(n_chunks.sum()) == 0:
            return empty
        crow = np.repeat(np.arange(t.num_rows), n_chunks)
        cid = np.concatenate([np.arange(k) for k in n_chunks if k])
        pos = cid * stride
        clen = np.minimum(window, cnt[crow] - pos)
        # gather every chunk's token span into one ListArray, join in C
        word_idx = np.concatenate(
            [np.arange(s, s + l)
             for s, l in zip(starts[crow] + pos, clen)]
        )
        po = np.r_[0, np.cumsum(clen)].astype(np.int32)
        packed = flat_arr.take(pa.array(word_idx, pa.int64()))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(po, pa.int32()), packed), " "
        )
        import hashlib

        hashes = [
            hashlib.md5(s.encode()).hexdigest()
            for s in joined.to_pylist()
        ]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[crow], pa.int64()),
                "chunk_id": pa.array(cid, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "n_tokens": pa.array(clen, pa.int64()),
                "chunk_hash": pa.array(hashes, pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk, batch_format="pyarrow"
    )


_FP_MOD = (1 << 61) - 1  # Mersenne prime: keeps values in int64 range
_FP_BASE = 256


def fingerprint64(text: str) -> int:
    """Deterministic polynomial rolling hash of the whole document
    (content fingerprint for shard-stable identity; PYTHONHASHSEED-proof).

    Equals the byte fold ``h = (h*256 + b + 1) % (2^61-1)`` but computed
    with three C-speed big-int ops instead of a per-byte Python loop:
    the fold's closed form is ``int.from_bytes(data) + (256^n - 1)/255``
    (the +1 offsets sum to a base-256 repunit), reduced once.
    """
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return 0
    v = int.from_bytes(data, "big") + ((1 << (8 * n)) - 1) // 255
    return v % _FP_MOD


def fingerprints(sf_dir: str) -> rd.Dataset:
    """(doc_id, fp): int64 content fingerprint per document."""
    import numpy as np

    def fp(t: pa.Table) -> pa.Table:
        vals = np.fromiter(
            (fingerprint64(x or "") for x in t["text"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(vals)})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# round 4: segment-level global dedup, corpus-relative quality signals
# ---------------------------------------------------------------------------


def segment_dedup(sf_dir: str, width: int = 10) -> rd.Dataset:
    """(doc_id, text_dedup, n_kept): C4-style duplicate-span removal at
    fixed ``width``-token segment granularity (the Lee et al. 2022
    exact-substring-dedup signal discretized to non-overlapping windows,
    which is what makes a global first-wins rule well-defined).

    Every document is cut into consecutive ``width``-token segments; a
    segment string that occurs anywhere else in the corpus survives only
    at its globally-first occurrence (min ``(doc_id, seg_no)``), and each
    document is reassembled from its surviving segments in order. Docs
    whose every segment lost disappear (same inner semantics as the SQL
    twin).

    Scale shape: segment emit is one vectorized pass (one split kernel,
    segment strings built by ``pc.binary_join`` over a re-offset view of
    the SAME token buffer — zero copies of text bytes); the global
    first-wins rule is ONE shuffle on a ``hash(seg) & (coarse_parts-1)``
    key (every occurrence of a segment colocates; pandas' C groupby
    resolves exact winners inside the partition, collision-proof because
    the key only places rows); reassembly is a second shuffle on
    ``doc_id & mask``. Both partition widths grow with the corpus via
    ``dedup.coarse_parts`` — no partition holds more than ~corpus/n.
    """
    import pandas as pd

    from raycrawl.pipelines.dedup import coarse_parts

    mask = coarse_parts(sf_dir) - 1

    def emit(t: pa.Table) -> pa.Table:
        # split on literal ' ' (NOT \s+/lower) so that rejoining surviving
        # segments with ' ' reproduces the original bytes exactly when
        # nothing is dropped — the SQL twin uses string_split(text, ' ')
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)  # >= 1 per doc: ''.split(' ') == ['']
        n_segs = -(-counts // width)
        total = int(n_segs.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "seg_no": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.string()),
                    "seg_part": pa.array([], pa.int64()),
                }
            )
        doc_rep = np.repeat(np.arange(len(t)), n_segs)
        first = np.cumsum(n_segs) - n_segs
        seg_no = np.arange(total) - first[doc_rep]
        starts = offs[doc_rep] + seg_no * width
        # each doc's last segment ends exactly where the next doc starts,
        # so starts + the final sentinel ARE the new list offsets over the
        # same token values buffer
        bounds = np.append(starts, offs[-1])
        segs = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(bounds, pa.int32()), toks.values
            ),
            " ",
        )
        # placement-only partition key (exact winners resolved in-group)
        part = (
            pd.util.hash_array(
                segs.to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            & mask
        )
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], pa.array(doc_rep)),
                "seg_no": pa.array(seg_no, pa.int64()),
                "seg": segs,
                "seg_part": pa.array(part, pa.int64()),
            }
        )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        w = g.sort_values(["seg", "doc_id", "seg_no"]).drop_duplicates("seg")
        return w[["doc_id", "seg_no", "seg"]]

    def add_doc_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "doc_part",
            pc.bit_wise_and(pc.cast(t["doc_id"], pa.int64()), mask),
        )

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "seg_no"])
        out = g.groupby("doc_id", as_index=False).agg(
            text_dedup=("seg", " ".join), n_kept=("seg", "size")
        )
        out["n_kept"] = out["n_kept"].astype("int64")
        return out[["doc_id", "text_dedup", "n_kept"]]

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("seg_part")
        .map_groups(winners, batch_format="pandas")
        .map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("doc_part")
        .map_groups(reassemble, batch_format="pandas")
    )


def common_token_ratio(sf_dir: str, k_hh: int = 32) -> rd.Dataset:
    """(doc_id, n_tokens, n_common, common_ratio_4096): fraction of each
    document's tokens that are corpus-level heavy hitters — a
    corpus-RELATIVE quality signal (a doc made of globally-rare tokens is
    likely junk/boilerplate-free; one made only of the corpus's most
    common tokens is likely templated).

    The "common" set is tokens with corpus frequency >= total/k_hh, which
    is AT MOST k_hh tokens at any corpus size (the classic heavy-hitters
    bound) — so the broadcast side is O(k_hh) forever, never
    O(vocabulary). Two passes: (1) distributed vocab count (partial
    per-batch counts before the one shuffle, same shape as vocab_topk),
    total + filter on the aggregated vocab (materialized once — bounded
    by vocab size, not corpus size); (2) stateless per-batch ``is_in``
    probe against the broadcast set. Integer ratio in 4096ths.
    """
    from ray.data.aggregate import Sum

    def explode_count(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [("token", "count")]
        )
        return g.rename_columns(["token", "n"])

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    vocab = coarse_sum(
        _read_docs(sf_dir, ["text"])
        .map_batches(explode_count, batch_format="pyarrow"),
        ["token"], ["n"], coarse_parts(sf_dir) - 1,
    ).materialize()  # aggregated vocab, read twice (total + filter)
    total = int(vocab.sum("n"))

    def hh_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(pc.multiply(t["n"], k_hh), total))

    hh = vocab.map_batches(hh_only, batch_format="pyarrow").take_all()
    hh_ref = ray.put(pa.array([r["token"] for r in hh], pa.string()))

    def score(t: pa.Table) -> pa.Table:
        hh_arr = ray.get(hh_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        flat = toks.values
        trow = np.repeat(
            np.arange(len(t)), np.diff(toks.offsets.to_numpy())
        )
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        member = pc.is_in(flat, value_set=hh_arr).to_numpy(
            zero_copy_only=False
        )
        n_tok = np.bincount(trow[nonempty], minlength=len(t)).astype(np.int64)
        n_com = np.bincount(
            trow[nonempty & member], minlength=len(t)
        ).astype(np.int64)
        ratio = np.where(n_tok > 0, (n_com * 4096) // np.maximum(n_tok, 1), 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_common": pa.array(n_com),
                "common_ratio_4096": pa.array(ratio, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def length_pctile(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_less, pctile_4096): each document's exact
    corpus length-percentile (count of strictly shorter docs, and its
    4096ths fraction) — the corpus-relative length filter of a curation
    pipeline ("drop the shortest 5%") computed exactly in two passes.

    Pass 1 reduces the corpus to a LENGTH HISTOGRAM (distributed partial
    bincounts, then one groupby-sum; the driver collect is bounded by the
    number of DISTINCT lengths, never the doc count). Pass 2 broadcasts
    the sorted lengths + exclusive prefix sums and ranks every doc with
    one vectorized searchsorted — no global sort of the corpus.
    """
    from ray.data.aggregate import Sum

    def count_partial(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        g = pa.table({"n_tokens": n}).group_by("n_tokens").aggregate(
            [("n_tokens", "count")]
        )
        return g.rename_columns(["n_tokens", "c"])

    hist = (
        _read_docs(sf_dir, ["text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()  # one row per DISTINCT length — domain-bounded
    )
    lens = np.array(sorted(r["n_tokens"] for r in hist), np.int64)
    cnts = np.array(
        [c for _, c in sorted((r["n_tokens"], r["c"]) for r in hist)],
        np.int64,
    )
    cum_less = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    total = int(cnts.sum())

    def rank(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lens, n, side="left")
        n_less = cum_less[idx]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n),
                "n_less": pa.array(n_less),
                "pctile_4096": pa.array((n_less * 4096) // max(total, 1)),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        rank, batch_format="pyarrow"
    )


def cooccur_topk(sf_dir: str, window: int = 2, k: int = 20) -> pa.Table:
    """(pair, n): top-k unordered token co-occurrence pairs within a
    ±``window`` token distance (never crossing a document boundary) — the
    count table GloVe-style embedding training and collocation mining
    read off first. Pair key is the lexicographically sorted token pair
    joined by one space, so (a,b) and (b,a) occurrences accumulate into
    one row on both engines.

    Scale shape: the pair explode is ``window`` shifted-slice passes over
    :func:`_flat_tokens` output (numpy + one pyarrow binary_join per
    distance — no Python loop over positions), counts are PARTIAL per
    batch (np.unique) before the one (a, b) shuffle, and the exchange
    moves one row per distinct (batch, pair), never one per occurrence.
    Deterministic (n desc, pair asc) tie-break.
    """
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    ds = (
        coarse_sum(
            _cooccur_counts(_read_docs(sf_dir, ["text"]), window),
            ["pair"], ["n"], coarse_parts(sf_dir) - 1,
        )
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
    )
    schema = pa.schema([("pair", pa.string()), ("n", pa.int64())])
    tbls = [
        b.select(schema.names)
        for b in ray.get(ds.to_arrow_refs())
        if b.num_rows
    ]
    if not tbls:
        return schema.empty_table()
    return pa.concat_tables(tbls).combine_chunks().cast(schema)


def _cooccur_counts(ds, window: int):
    """Per-batch partial (pair, n) counts of sorted within-window token
    pairs — the shared explode kernel for cooccur_topk and pmi_topk."""
    import numpy as np

    def explode(t: pa.Table) -> pa.Table:
        flat, trow = _flat_tokens(t)
        keys = []
        for d in range(1, window + 1):
            m = len(flat) - d
            if m <= 0:
                continue
            a, b = flat[:m], flat[d:]
            ok = trow[:m] == trow[d:]
            a, b = a[ok], b[ok]
            if not len(a):
                continue
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            keys.append(
                pc.binary_join_element_wise(
                    pa.array(lo, pa.string()), pa.array(hi, pa.string()), " "
                ).to_numpy(zero_copy_only=False)
            )
        if not keys:
            return pa.table(
                {"pair": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        pairs, counts = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table(
            {
                "pair": pa.array(pairs, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def pmi_topk(
    sf_dir: str, window: int = 2, k: int = 20, min_count: int = 5
) -> pa.Table:
    """(pair, n_xy, n_x, n_y, pmi_scaled): top-k collocations by an
    exact-integer PMI proxy — ``pmi_scaled = (n_xy * N * 10^6) //
    (n_x * n_y)`` where N is the corpus token count, a monotone transform
    of pointwise mutual information with the normalizing constant folded
    in. Integer end to end so the DuckDB twin reproduces every bit (the
    product needs n_xy * N * 10^6 < 2^63: fine through ~10^5-token-scale
    test corpora; the web-scale path drops the 10^6 premultiplier or
    moves to 128-bit like the oracle's HUGEINT).

    Scale shape: pair counts and unigram counts are both partial-per-batch
    before their shuffles; the per-token frequencies reach the pairs via
    TWO hash-partitioned joins on the token (never a broadcast of the
    vocabulary and never a driver-side dict), and only pairs with
    ``n_xy >= min_count`` enter the joins. Deterministic
    (pmi_scaled desc, pair asc) tie-break.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import clean_blocks
    from raycrawl.pipelines.relops import join_parts

    docs = _read_docs(sf_dir, ["text"])
    n_parts = join_parts()

    # corpus unigram counts (one row per distinct (batch, token) into the
    # shuffle) + the scalar total
    def uni_partial(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t)
        if not len(flat):
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n_tok": pa.array([], pa.int64())}
            )
        toks, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "n_tok": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    cmask = coarse_parts(sf_dir) - 1
    uni_schema = pa.schema([("token", pa.string()), ("n_tok", pa.int64())])
    # vocabulary-cardinality sum -> coarse partitions (the cost rule)
    uni = clean_blocks(
        coarse_sum(
            docs.map_batches(uni_partial, batch_format="pyarrow"),
            ["token"], ["n_tok"], cmask,
        ),
        uni_schema,
    ).materialize()  # joined twice below; blocks stay in plasma
    total = int(uni.sum("n_tok") or 0)

    pair_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("n_xy", pa.int64())]
    )

    def split_pair(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], min_count))
        parts = pc.split_pattern(t["pair"], " ", max_splits=1)
        return pa.table(
            {
                "a": pc.list_element(parts, 0),
                "b": pc.list_element(parts, 1),
                "n_xy": t["n"],
            }
        )

    pairs = clean_blocks(
        coarse_sum(_cooccur_counts(docs, window), ["pair"], ["n"], cmask)
        .map_batches(split_pair, batch_format="pyarrow"),
        pair_schema,
    )

    def ren(old: str, new: str):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [new if c == old else c for c in t.column_names]
            )
        return f

    ua = uni.map_batches(ren("n_tok", "n_x"), batch_format="pyarrow")
    ub = uni.map_batches(ren("n_tok", "n_y"), batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        n_xy = t["n_xy"].to_numpy(zero_copy_only=False)
        n_x = t["n_x"].to_numpy(zero_copy_only=False)
        n_y = t["n_y"].to_numpy(zero_copy_only=False)
        num = n_xy.astype(np.int64) * total * 1_000_000
        if len(num) and (num // max(total, 1) // 1_000_000 != n_xy).any():
            raise OverflowError(
                "pmi_topk int64 premultiplier overflow — drop the 10^6 "
                "scale or use the 128-bit path at this corpus size"
            )
        return pa.table(
            {
                "pair": pc.binary_join_element_wise(t["a"], t["b"], " "),
                "n_xy": t["n_xy"],
                "n_x": t["n_x"],
                "n_y": t["n_y"],
                "pmi_scaled": pa.array(num // (n_x * n_y), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("pair", pa.string()), ("n_xy", pa.int64()), ("n_x", pa.int64()),
         ("n_y", pa.int64()), ("pmi_scaled", pa.int64())]
    )
    # clean_blocks between the joins: a tiny corpus leaves schema-less
    # empty blocks after the first hash join, and the second join's key
    # resolution rejects them (the Ray 2.49 empty-block sharp edge)
    half = clean_blocks(
        pairs.join(ua, join_type="inner", num_partitions=n_parts,
                   on=("a",), right_on=("token",)),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("n_xy", pa.int64()), ("n_x", pa.int64())]),
    )
    ds = (
        half.join(ub, join_type="inner", num_partitions=n_parts,
                  on=("b",), right_on=("token",))
        .map_batches(score, batch_format="pyarrow")
        .sort(["pmi_scaled", "pair"], descending=[True, False])
        .limit(k)
    )
    tbls = [
        b.select(out_schema.names)
        for b in ray.get(ds.to_arrow_refs())
        if b.num_rows
    ]
    if not tbls:
        return out_schema.empty_table()
    return pa.concat_tables(tbls).combine_chunks().cast(out_schema)


def _bpe_reference(word_counts: dict, n_merges: int) -> list:
    """Single-node reference BPE trainer (classic dict algorithm) — the
    exactness twin for :func:`bpe_train`'s distributed result. Greedy
    left-to-right merge application, ties broken (count desc, left asc,
    right asc)."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, n in word_counts.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


# --- shared BPE kernels (bpe_train + bpe_encode) -------------------------

_BPE_VOCAB_SCHEMA = pa.schema(
    [("word", pa.string()), ("n", pa.int64()),
     ("syms", pa.list_(pa.string()))]
)


def _bpe_word_partial(t: pa.Table) -> pa.Table:
    flat, _ = _flat_tokens(t)
    if not len(flat):
        return pa.table(
            {"word": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
    w, c = np.unique(flat, return_counts=True)
    return pa.table(
        {"word": pa.array(w, pa.string()),
         "n": pa.array(c.astype(np.int64), pa.int64())}
    )


def _bpe_init_syms(t: pa.Table) -> pa.Table:
    syms = pa.array(
        [list(w) for w in t["word"].to_pylist()],
        pa.list_(pa.string()),
    )
    return pa.table({"word": t["word"], "n": t["n"], "syms": syms})


def _bpe_flat_syms(t: pa.Table):
    syms = t["syms"].combine_chunks()
    flat = syms.flatten().to_numpy(zero_copy_only=False)
    offs = syms.offsets.to_numpy()
    row = np.repeat(np.arange(len(t)), np.diff(offs))
    return flat, offs, row


def _bpe_apply_merge(left: str, right: str):
    """Vectorized greedy left-to-right application of ONE merge over a
    vocab batch: matches are shifted-slice equality, overlapping runs
    resolve with the parity pass (keep every other match from each run
    head)."""
    merged = left + right

    def f(t: pa.Table) -> pa.Table:
        flat, offs, row = _bpe_flat_syms(t)
        if len(flat) < 2:
            return t
        m = (row[:-1] == row[1:]) & (flat[:-1] == left) & (flat[1:] == right)
        idx = np.flatnonzero(m)
        if not len(idx):
            return t
        grp = idx - np.arange(len(idx))  # constant within a run
        starts = np.r_[True, grp[1:] != grp[:-1]]
        run_head = idx[starts][np.cumsum(starts) - 1]
        keep = idx[((idx - run_head) % 2) == 0]
        new_flat = flat.copy()
        new_flat[keep] = merged
        delete = np.zeros(len(flat), bool)
        delete[keep + 1] = True
        kept_mask = ~delete
        out_flat = new_flat[kept_mask]
        drops = np.bincount(row[keep], minlength=len(t))
        new_lens = np.diff(offs) - drops
        new_offs = np.r_[0, np.cumsum(new_lens)].astype(np.int32)
        syms = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()),
            pa.array(out_flat, pa.string()),
        )
        return pa.table({"word": t["word"], "n": t["n"], "syms": syms})

    return f


def _bpe_apply_merges(merges: list):
    """Sequential in-batch application of a PROVABLY-independent merge
    prefix (symbols pairwise disjoint — see the acceptance rule in
    bpe_train): equals running the k single-merge passes, in one pass."""
    fns = [_bpe_apply_merge(l, r) for l, r in merges]

    def f(t: pa.Table) -> pa.Table:
        for g in fns:
            t = g(t)
        return t

    return f


def bpe_train(sf_dir: str, n_merges: int = 8, check: bool = True) -> pa.Table:
    """(rank, left, right, n): the first ``n_merges`` BPE merges learned
    from the corpus — distributed tokenizer training, the step every LLM
    data pipeline runs before tokenizing anything. Standard weighted BPE:
    train on the DISTINCT-word frequency table (one corpus shuffle, ever);
    each merge round counts adjacent symbol pairs weighted by word count,
    picks the argmax (ties: count desc, then pair asc — deterministic),
    and rewrites the vocab's symbol sequences greedily left-to-right.

    Scale shape: the corpus is touched ONCE (word-count partials, then one
    groupby); every merge round runs over the distinct-WORD table —
    orders of magnitude smaller, and still a Dataset (per-batch pair
    counting and merge application are fully vectorized: symbols flatten
    to one numpy array + offsets, pairs are shifted slices, greedy
    overlapping-run resolution is a parity pass over match runs — no
    Python loop over words). The argmax is a 1-row driver collect per
    round (sort desc, limit 1); n_merges is fixed, so rounds are
    checkpointable. Not SQL-expressible (iterative greedy rewriting), so
    instead of a DuckDB twin the result self-checks at query time: the
    collected distinct-word count table (bounded by |vocab|, tiny at gate
    scale; skip with check=False at web scale) must reproduce the merge
    table EXACTLY through the single-node reference trainer."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import clean_blocks

    vocab = clean_blocks(
        _read_docs(sf_dir, ["text"])
        .map_batches(_bpe_word_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(_bpe_init_syms, batch_format="pyarrow"),
        _BPE_VOCAB_SCHEMA,
    ).materialize()

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, offs, row = _bpe_flat_syms(t)
        empty = pa.table(
            {"left": pa.array([], pa.string()),
             "right": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
        if len(flat) < 2:
            return empty
        ok = row[:-1] == row[1:]
        if not ok.any():
            return empty
        wts = t["n"].to_numpy(zero_copy_only=False)[row[:-1][ok]]
        g = (
            pd.DataFrame(
                {"left": flat[:-1][ok], "right": flat[1:][ok], "n": wts}
            )
            .groupby(["left", "right"], sort=False, as_index=False)["n"]
            .sum()
        )
        return pa.table(
            {
                "left": pa.array(g["left"].to_numpy(), pa.string()),
                "right": pa.array(g["right"].to_numpy(), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    # Speculative merge batching (round 5): each driver round trip
    # collects the top-M pair counts and accepts the LONGEST PREFIX of
    # candidates that is PROVABLY the next run of sequential-BPE picks —
    # no rollback path needed. Walking candidates in (n desc, pair asc)
    # order, candidate i is accepted iff
    #   (1) its symbols are disjoint from every earlier accepted merge's
    #       {L, R, LR} (its own count is then unchanged by them), and
    #   (2) its count STRICTLY exceeds every listed pair touching an
    #       accepted symbol (old touched pairs only decrease; any NEW
    #       pair (X, LR_j) is bounded by the current (X, L_j) count, and
    #       (LR_j, Y) by (R_j, Y)), and
    #   (3) its count STRICTLY exceeds the M-th listed count (so every
    #       UNLISTED pair — and hence every new pair bounded by one — is
    #       strictly smaller too).
    # Any violation (or a conflicting higher-ranked candidate) ends the
    # batch at the last provably-correct merge; the accepted prefix is
    # applied in ONE pass (disjoint merges commute, so the sequential
    # in-kernel application equals k separate rounds). Worst case the
    # prefix is length 1 = the round-4 behavior; typical Zipf-shaped
    # counts batch 2-4 merges per launch, cutting the per-merge
    # executor-launch serialization the same factor.
    spec_k = max(1, int(os.environ.get("RAYCRAWL_BPE_BATCH", "4")))
    top_m = 2 * spec_k + 2
    merges = []
    while len(merges) < n_merges:
        cands = (
            clean_blocks(
                vocab.map_batches(pair_partial, batch_format="pyarrow")
                .groupby(["left", "right"])
                .aggregate(Sum("n", alias_name="n")),
                pa.schema([("left", pa.string()), ("right", pa.string()),
                           ("n", pa.int64())]),
            )
            .sort(["n", "left", "right"], descending=[True, False, False])
            .limit(top_m)
            .take_all()
        )
        if not cands or cands[0]["n"] < 2:
            break
        tail_n = cands[-1]["n"] if len(cands) == top_m else 0
        accepted: list = []
        acc_pairs: set = set()
        blocked: set = set()
        for c in cands:
            left, right, cnt = c["left"], c["right"], int(c["n"])
            if cnt < 2:
                break
            if accepted:
                if (left in blocked or right in blocked
                        or cnt <= tail_n):
                    break
                if len(accepted) >= spec_k \
                        or len(merges) + len(accepted) >= n_merges:
                    break
                # (2): every OTHER listed pair touching accepted symbols
                # must sit strictly below cnt (the accepted merges
                # themselves are exempt — they are the earlier picks).
                # Equality is unsafe: a touched pair's derived new pair
                # could tie cnt and win on lex order.
                if any(
                    int(o["n"]) >= cnt
                    and (o["left"] in blocked or o["right"] in blocked)
                    and (o["left"], o["right"]) not in acc_pairs
                    for o in cands
                ):
                    break
            accepted.append((left, right, cnt))
            acc_pairs.add((left, right))
            blocked |= {left, right, left + right}
        if not accepted:  # top candidate below the min-count floor
            break
        merges.extend(accepted)
        vocab = clean_blocks(
            vocab.map_batches(
                _bpe_apply_merges([(l, r) for l, r, _ in accepted]),
                batch_format="pyarrow",
            ),
            _BPE_VOCAB_SCHEMA,
        ).materialize()

    out = pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "n": pa.array([m[2] for m in merges], pa.int64()),
        }
    )
    if check:
        # exactness self-check (the non-SQL twin): the collected distinct-
        # word table is |vocab|-bounded — fine at gate scale, disable at
        # web scale
        wc = {}
        for b in vocab.select_columns(["word", "n"]).iter_batches(
            batch_format="pyarrow"
        ):
            for w, n in zip(b["word"].to_pylist(), b["n"].to_pylist()):
                wc[w] = wc.get(w, 0) + n
        ref = _bpe_reference(wc, n_merges)
        got = list(zip(out["left"].to_pylist(), out["right"].to_pylist(),
                       out["n"].to_pylist()))
        if got != ref:
            raise AssertionError(
                f"distributed BPE diverged from reference: {got} != {ref}"
            )
    return out


def feature_hash(sf_dir: str, dims: int = 64) -> rd.Dataset:
    """(doc_id, dim, tf): fixed-width bag-of-words embedding by the
    hashing trick (Weinberger et al. 2009) — dim = md5(token) mod dims,
    tf = the token count landing in that bucket. The vectorizer every
    scalable linear model / sketching pipeline uses when a vocabulary
    dict can't exist.

    Scale shape: embarrassingly parallel — each doc is one row, so the
    whole (doc_id, dim, tf) melt happens inside one map_batches with NO
    shuffle at all; per batch the md5 runs once per DISTINCT token
    (np.unique + inverse), and the (doc, dim) count is one pandas C
    groupby. dim is the md5 digest's last byte mod dims, which the DuckDB
    twin recomputes nibble-exactly from md5 hex — bit-identical, no
    engine-specific hash anywhere."""
    import hashlib

    import pandas as pd

    def vec(t: pa.Table) -> pa.Table:
        flat, row = _flat_tokens(t)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "dim": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )
        if not len(flat):
            return empty
        uniq, inv = np.unique(flat, return_inverse=True)
        dimmap = np.fromiter(
            (int(hashlib.md5(w.encode()).hexdigest()[-2:], 16) % dims
             for w in uniq),
            np.int64,
            count=len(uniq),
        )
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[row]
        g = (
            pd.DataFrame({"doc_id": doc_ids, "dim": dimmap[inv]})
            .groupby(["doc_id", "dim"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "dim": pa.array(g["dim"].to_numpy(np.int64)),
                "tf": pa.array(g["tf"].to_numpy(np.int64)),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        vec, batch_format="pyarrow"
    )


# C4-style blocklist scrub: word-boundary alternation over a fixed policy
# list. RE2 on both engines (pyarrow replace_substring_regex / DuckDB
# regexp_replace with the 'g' flag), so the redacted text is byte-identical.
SCRUB_BLOCKLIST = ("spark", "scan", "merge")
SCRUB_PATTERN = r"\b(?:" + "|".join(SCRUB_BLOCKLIST) + r")\b"
SCRUB_TOKEN = "[REDACTED]"


def scrub(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_hits, keep, scrubbed): C4-style blocklist redaction.

    The curation move every web-text recipe applies before training:
    redact policy-listed terms in place, count the hits, and carry the
    C4 drop rule (``keep`` = the document had no hits at all) so the
    caller can either filter or keep the redacted text.

    Scale shape: one stateless ``map_batches`` pass, two RE2 kernels per
    batch (count + global replace) — no shuffle, no state, no Python
    loop; streams at any corpus size.
    """

    def redact(t: pa.Table) -> pa.Table:
        hits = pc.cast(
            pc.count_substring_regex(t["text"], SCRUB_PATTERN), pa.int64()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": hits,
                "keep": pc.cast(pc.equal(hits, 0), pa.int64()),
                "scrubbed": pc.replace_substring_regex(
                    t["text"], SCRUB_PATTERN, SCRUB_TOKEN
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow"
    )


def pack_manifest(sf_dir: str, seq_len: int = 128) -> rd.Dataset:
    """(doc_id, n_tokens, start_offset, first_seq, last_seq): GPT-style
    concat-and-chunk sequence-packing manifest.

    Documents are conceptually concatenated in doc_id order into one
    token stream that is cut into fixed ``seq_len`` windows; the manifest
    records each document's global token offset and the first/last
    training sequence it lands in — exactly what a packing dataloader
    needs to locate any document without re-tokenizing the corpus.

    The global prefix sum is DISTRIBUTED: pass 1 reduces each coarse
    doc_id range (width from :func:`~raycrawl.pipelines.dedup.coarse_parts`,
    dense-id assumption only skews partition sizes, never correctness) to
    one token-count partial — the driver scan is over O(parts) rows,
    never O(docs) — and pass 2 shuffles only (doc_id, n_tokens, part)
    [no text] so each partition cumsums its own range on top of the
    broadcast base offset. Zero-token docs get the degenerate span
    ``first_seq == last_seq`` of their offset (``max(n,1)`` width), so
    every doc_id appears exactly once.
    """
    import os as _os

    import pandas as pd
    import pyarrow.parquet as _pq

    from raycrawl.pipelines.dedup import coarse_parts

    n_docs = _pq.read_metadata(
        _os.path.join(sf_dir, "documents.parquet")
    ).num_rows
    width = max(1, -(-n_docs // coarse_parts(sf_dir)))

    def partial(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        part = pc.divide(t["doc_id"], width)
        g = (
            pa.table({"part": part, "n": n})
            .group_by("part")
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["part", "n"])

    from ray.data.aggregate import Sum

    totals = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # one row per coarse doc_id range — O(parts), tiny
    )
    parts = np.array(sorted(r["part"] for r in totals), np.int64)
    sums = np.array(
        [n for _, n in sorted((r["part"], r["n"]) for r in totals)], np.int64
    )
    base = dict(
        zip(parts.tolist(), np.concatenate(([0], np.cumsum(sums)[:-1])).tolist())
    )

    def tag(t: pa.Table) -> pa.Table:
        # pass 2 ships only the 3 integer columns into the shuffle
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
                ),
                "part": pc.divide(t["doc_id"], width),
            }
        )

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        start = base[int(g["part"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        first = start // seq_len
        last = (start + np.maximum(n, 1) - 1) // seq_len
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": n,
                "start_offset": start,
                "first_seq": first,
                "last_seq": last,
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(offsets, batch_format="pandas")
    )


def oov_rate(sf_dir: str, v: int = 16) -> rd.Dataset:
    """(doc_id, n_tokens, n_oov, oov_ratio_4096): out-of-vocabulary rate
    of every document against the corpus's own top-``v`` vocabulary — the
    tokenizer-coverage signal a data-mixing recipe reads before fixing a
    vocab size.

    Two passes, both bounded: (1) the distributed wordcount (partial
    per-batch counts before the one token shuffle, same shape as
    :func:`vocab_topk`) keeps only the deterministic top-v (count desc,
    token asc) — the broadcast side is O(v) forever; (2) a stateless
    per-batch ``is_in`` probe scores every doc. Integer ratio in 4096ths;
    token contract is lower + whitespace split (shared with
    :func:`common_token_ratio`).
    """
    from ray.data.aggregate import Sum

    def explode_count(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [("token", "count")]
        )
        return g.rename_columns(["token", "n"])

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    top = (
        coarse_sum(
            _read_docs(sf_dir, ["text"])
            .map_batches(explode_count, batch_format="pyarrow"),
            ["token"], ["n"], coarse_parts(sf_dir) - 1,
        )
        .sort(["n", "token"], descending=[True, False])
        .limit(v)
        .take_all()  # O(v) rows
    )
    vocab_arr = pa.array(sorted(r["token"] for r in top), pa.string())

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        flat = toks.values
        trow = np.repeat(np.arange(len(t)), np.diff(toks.offsets.to_numpy()))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        member = pc.is_in(flat, value_set=vocab_arr).to_numpy(
            zero_copy_only=False
        )
        n_tok = np.bincount(trow[nonempty], minlength=len(t)).astype(np.int64)
        n_oov = np.bincount(
            trow[nonempty & ~member], minlength=len(t)
        ).astype(np.int64)
        ratio = np.where(n_tok > 0, (n_oov * 4096) // np.maximum(n_tok, 1), 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_oov": pa.array(n_oov),
                "oov_ratio_4096": pa.array(ratio, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def dsir_weights(sf_dir: str, dims: int = 64, scale: int = 4096,
                 target_lang: str = "en") -> rd.Dataset:
    """(doc_id, n_tokens, dsir_weight): DSIR-style importance weights
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling") — score every document by how target-like its hashed
    token features are, the data-mixing move that upsamples docs
    resembling a trusted target subset (here: ``lang == target_lang``).

    Features are md5-hashed token buckets (the paper's hashed n-grams;
    the same nibble trick as :func:`feature_hash` so the SQL twin
    recomputes the bucket bit-exactly). Per-bucket quantized likelihood
    ratio ``ratio = (n_target * total_all * scale) // (n_all *
    total_target)`` is computed on the DRIVER in arbitrary-precision
    Python ints (no int64 overflow at any corpus size) from an O(dims)
    aggregate, then broadcast; a document's weight is the sum of its
    token occurrences' ratios — a quantized linear-domain importance
    score (monotone in the paper's ratio; the log transform is left to
    the caller, floats don't hash stably).

    Scale shape: pass 1 ships one (dim, n_all, n_target) partial row per
    (batch, dim) into an O(dims) shuffle; pass 2 is a stateless probe
    against the O(dims) broadcast ratio table. Nothing grows with the
    corpus except the streaming passes themselves.
    """
    import hashlib

    from ray.data.aggregate import Sum

    def dim_of(uniq):
        return np.fromiter(
            (int(hashlib.md5(w.encode()).hexdigest()[-2:], 16) % dims
             for w in uniq),
            np.int64,
            count=len(uniq),
        )

    def partial(t: pa.Table) -> pa.Table:
        flat, row = _flat_tokens(t)
        if not len(flat):
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "n_all": pa.array([], pa.int64()),
                 "n_tgt": pa.array([], pa.int64())}
            )
        uniq, inv = np.unique(flat, return_inverse=True)
        d = dim_of(uniq)[inv]
        is_tgt = pc.equal(t["lang"], target_lang).to_numpy(
            zero_copy_only=False
        )[row]
        n_all = np.bincount(d, minlength=dims)
        n_tgt = np.bincount(d[is_tgt], minlength=dims)
        keep = n_all > 0
        return pa.table(
            {
                "dim": pa.array(np.arange(dims)[keep], pa.int64()),
                "n_all": pa.array(n_all[keep], pa.int64()),
                "n_tgt": pa.array(n_tgt[keep], pa.int64()),
            }
        )

    counts = (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Sum("n_all", alias_name="n_all"),
                   Sum("n_tgt", alias_name="n_tgt"))
        .take_all()  # <= dims rows
    )
    total_all = sum(r["n_all"] for r in counts)
    total_tgt = max(sum(r["n_tgt"] for r in counts), 1)
    ratio = np.zeros(dims, np.int64)
    for r in counts:  # python ints: exact at any corpus size
        ratio[r["dim"]] = (
            r["n_tgt"] * total_all * scale
        ) // (r["n_all"] * total_tgt)

    def score(t: pa.Table) -> pa.Table:
        flat, row = _flat_tokens(t)
        n_tok = np.bincount(row, minlength=len(t)).astype(np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            w = ratio[dim_of(uniq)[inv]]
            wgt = np.bincount(row, weights=w, minlength=len(t)).astype(
                np.int64
            )
        else:
            wgt = np.zeros(len(t), np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "dsir_weight": pa.array(wgt),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def fluency(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bigrams, sum_freq, fluency_avg): corpus-relative bigram
    fluency — each document's mean corpus frequency over its ORDERED
    adjacent-token bigrams. The exact-integer stand-in for a KenLM-style
    perplexity filter: garbled/boilerplate text strings together rare
    transitions and scores low; only docs with >= 2 tokens appear.

    Scale shape: bigram counts and per-doc bigram partials are both
    pre-aggregated per batch before their shuffles, and the per-gram
    frequencies reach the documents via ONE hash-partitioned join on the
    gram (never a broadcast of the bigram vocabulary, which is unbounded);
    the per-doc reduce is an ordinary integer groupby-sum.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import clean_blocks
    from raycrawl.pipelines.relops import join_parts

    def gram_partial(t: pa.Table) -> pa.Table:
        g, _ = _shingles(*_flat_tokens(t), 2)
        if not len(g):
            return pa.table(
                {"gram": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        grams, counts = np.unique(g, return_counts=True)
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from raycrawl.pipelines.dedup import coarse_parts, coarse_sum

    cmask = coarse_parts(sf_dir) - 1
    gram_schema = pa.schema([("gram", pa.string()), ("n_gram", pa.int64())])
    gc = clean_blocks(
        coarse_sum(
            _read_docs(sf_dir, ["text"])
            .map_batches(gram_partial, batch_format="pyarrow"),
            ["gram"], ["n"], cmask,
        ).map_batches(
            lambda t: t.rename_columns(["gram", "n_gram"]),
            batch_format="pyarrow",
        ),
        gram_schema,
    )

    def doc_partial(t: pa.Table) -> pa.Table:
        g, grow = _shingles(*_flat_tokens(t), 2)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "gram": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
        if not len(g):
            return empty
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[grow]
        agg = (
            pd.DataFrame({"doc_id": doc_ids, "gram": g})
            .groupby(["doc_id", "gram"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64)),
                "gram": pa.array(agg["gram"], pa.string()),
                "tf": pa.array(agg["tf"].to_numpy(np.int64)),
            }
        )

    doc_schema = pa.schema(
        [("doc_id", pa.int64()), ("gram", pa.string()), ("tf", pa.int64())]
    )
    dg = clean_blocks(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            doc_partial, batch_format="pyarrow"
        ),
        doc_schema,
    )

    def weight(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": t["tf"],
                "freq": pc.multiply(t["tf"], t["n_gram"]),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": t["n_bigrams"],
                "sum_freq": t["sum_freq"],
                "fluency_avg": pc.divide(t["sum_freq"], t["n_bigrams"]),
            }
        )

    joined = clean_blocks(
        dg.join(gc, join_type="inner", num_partitions=join_parts(),
                on=("gram",)),
        pa.schema([("doc_id", pa.int64()), ("gram", pa.string()),
                   ("tf", pa.int64()), ("n_gram", pa.int64())]),
    )
    per_doc = coarse_sum(
        joined.map_batches(weight, batch_format="pyarrow"),
        ["doc_id"], ["n_bigrams", "freq"], cmask,
    ).map_batches(
        lambda t: t.rename_columns(["doc_id", "n_bigrams", "sum_freq"]),
        batch_format="pyarrow",
    )
    return per_doc.map_batches(finish, batch_format="pyarrow")


# independent draw from hash_split/stratified_sample: splitmix64's
# finalizer multipliers (public constants), so shard placement never
# correlates with the split or the sampler
_SHARD_MUL = 0xBF58476D1CE4E5B9
_SHARD_ADD = 0x94D049BB133111EB


def shuffle_shards(sf_dir: str, n_shards: int = 64) -> rd.Dataset:
    """(doc_id, shard, pos): deterministic global training-data shuffle as
    (shard, position) assignment — the one-pass, sort-free way to shuffle
    a corpus for training: an affine id hash places every doc in one of
    ``n_shards`` output shards (top hash bits) and orders it WITHIN the
    shard (low hash bits, doc_id tie-break), so reading the shards in
    order replays one fixed pseudo-random permutation. Stable under
    re-runs and re-partitioning; independent of the train/val/test split
    and the stratified sampler by construction (distinct mixer
    constants).

    Scale shape: one stateless hash pass, then each shard ranks its own
    members inside a ``groupby(shard).map_groups`` partition — the only
    shuffle, moving 3 integer columns. ``n_shards`` is a SEMANTIC
    parameter (it defines the output permutation): size it so
    corpus/n_shards fits a worker (a 100-TB run wants 10^4-10^5 shards,
    not 64 — 64 is the small-scale oracle default).
    """
    import pandas as pd

    if n_shards & (n_shards - 1) or n_shards <= 0:
        raise ValueError(f"n_shards must be a positive power of two, got {n_shards}")
    shift = 64 - (n_shards.bit_length() - 1)
    pos_mask = (1 << 52) - 1

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * np.uint64(_SHARD_MUL) + np.uint64(_SHARD_ADD)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shard": pa.array((h >> np.uint64(shift)).astype(np.int64)),
                "pos_key": pa.array(
                    (h & np.uint64(pos_mask)).astype(np.int64)
                ),
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pos_key", "doc_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "shard": g["shard"],
                "pos": np.arange(len(g), dtype=np.int64),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
    )


def boilerplate_strip(
    sf_dir: str, width: int = 10, min_docs: int = 2
) -> rd.Dataset:
    """(doc_id, n_segments, n_boiler, text_clean): CCNet-style per-source
    boilerplate removal — a ``width``-token segment that recurs across
    >= ``min_docs`` DISTINCT documents of the SAME source is template
    chrome (nav bars, footers, cookie banners) and is stripped from every
    document of that source; each doc is reassembled from its surviving
    segments in order (C4's span discretization applied to CCNet's
    shared-across-pages rule). Every doc keeps a row (``text_clean`` is
    '' when everything was boilerplate).

    Scale shape: same two-shuffle plan as :func:`segment_dedup` — the
    vectorized zero-copy segment emit, then ONE shuffle on
    ``hash(source, seg) & (coarse_parts-1)`` (every occurrence of a
    (source, segment) colocates; pandas resolves the exact distinct-doc
    counts in-group), then the ``doc_id & mask`` reassembly shuffle.
    Both partition widths grow with the corpus via ``dedup.coarse_parts``.
    """
    import pandas as pd

    from raycrawl.pipelines.dedup import coarse_parts

    mask = coarse_parts(sf_dir) - 1

    def emit(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ").combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        counts = np.diff(offs)
        n_segs = -(-counts // width)
        total = int(n_segs.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "seg_no": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.string()),
                    "seg_part": pa.array([], pa.int64()),
                }
            )
        doc_rep = np.repeat(np.arange(len(t)), n_segs)
        first = np.cumsum(n_segs) - n_segs
        seg_no = np.arange(total) - first[doc_rep]
        starts = offs[doc_rep] + seg_no * width
        bounds = np.append(starts, offs[-1])
        segs = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(bounds, pa.int32()), toks.values
            ),
            " ",
        )
        src = pc.take(t["source"], pa.array(doc_rep))
        # placement key from the (source, seg) PAIR: hash each column and
        # mix numerically — never join with a sentinel byte, because
        # pd.util.hash_array truncates object strings at embedded NULs
        # (verified on pandas 2.2: 'a\\x00b' and 'a\\x00c' hash equal)
        hs = pd.util.hash_array(segs.to_numpy(zero_copy_only=False))
        hsrc = pd.util.hash_array(src.to_numpy(zero_copy_only=False))
        part = (
            (hs ^ (hsrc * np.uint64(0x9E3779B97F4A7C15)))
            .astype(np.int64)
            & mask
        )
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"], pa.array(doc_rep)),
                "source": src,
                "seg_no": pa.array(seg_no, pa.int64()),
                "seg": segs,
                "seg_part": pa.array(part, pa.int64()),
            }
        )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby(["source", "seg"])["doc_id"].transform("nunique")
        out = g[["doc_id", "seg_no", "seg"]].copy()
        out["boiler"] = (nd >= min_docs).to_numpy()
        return out

    def add_doc_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "doc_part",
            pc.bit_wise_and(pc.cast(t["doc_id"], pa.int64()), mask),
        )

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "seg_no"])
        stats = g.groupby("doc_id", as_index=False).agg(
            n_segments=("seg", "size"), n_boiler=("boiler", "sum")
        )
        kept = (
            g[~g["boiler"]]
            .groupby("doc_id", as_index=False)
            .agg(text_clean=("seg", " ".join))
        )
        out = stats.merge(kept, on="doc_id", how="left")
        out["text_clean"] = out["text_clean"].fillna("")
        out["n_segments"] = out["n_segments"].astype("int64")
        out["n_boiler"] = out["n_boiler"].astype("int64")
        return out[["doc_id", "n_segments", "n_boiler", "text_clean"]]

    return (
        _read_docs(sf_dir, ["doc_id", "source", "text"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("seg_part")
        .map_groups(flag, batch_format="pandas")
        .map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("doc_part")
        .map_groups(reassemble, batch_format="pandas")
    )


def prepare(sf_dir: str, min_tokens: int = 5) -> rd.Dataset:
    """(doc_id, split, shard, pos): the composed end-to-end training-data
    PREP decision — the round-4 flagship that chains the curation ops a
    real pre-training pipeline runs in sequence, one document manifest
    out. A document survives iff it has no blocklist hits
    (:func:`scrub`), is its exact-duplicate group's first occurrence
    (min doc_id per identical text), and has >= ``min_tokens`` tokens;
    survivors get their deterministic train/val/test split
    (:func:`hash_split` buckets) and TRAIN survivors additionally get
    their (shard, in-shard position) from the :func:`shuffle_shards`
    permutation RANKED OVER SURVIVORS ONLY (what the dataloader actually
    reads); val/test rows carry (-1, -1).

    Scale shape: one signal pass fused with the exact-dedup shuffle
    (text moves once, grouped by ``hash(text) & (coarse_parts-1)``; the
    winner rule resolves exactly in-group), then a stateless
    split/filter, then the train-only rank shuffle moving 3 integer
    columns. Nothing is materialized driver-side.
    """
    import hashlib

    import pandas as pd

    from raycrawl.pipelines.dedup import coarse_parts

    mask = coarse_parts(sf_dir) - 1
    thr_t = 4096 * 80 // 100
    thr_v = 4096 * 90 // 100

    def signals(t: pa.Table) -> pa.Table:
        hits = pc.cast(
            pc.count_substring_regex(t["text"], SCRUB_PATTERN), pa.int64()
        )
        n_tok = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        part = np.fromiter(
            (int.from_bytes(
                hashlib.blake2b((x or "").encode(), digest_size=8).digest(),
                "little") & mask
             for x in t["text"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "n_tokens": n_tok,
                "n_hits": hits,
                "text_part": pa.array(part),
            }
        )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby("text")["doc_id"].transform("min") == g["doc_id"]
        out = g.loc[keep, ["doc_id", "n_tokens", "n_hits"]]
        return out.reset_index(drop=True)

    def split_filter(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t["n_hits"], 0),
                pc.greater_equal(t["n_tokens"], min_tokens),
            )
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (
            (ids * np.uint64(_SPLIT_MUL) + np.uint64(_SPLIT_ADD))
            >> np.uint64(52)
        ).astype(np.int64)
        split = np.where(
            bucket < thr_t, "train", np.where(bucket < thr_v, "val", "test")
        )
        h = ids * np.uint64(_SHARD_MUL) + np.uint64(_SHARD_ADD)
        is_train = split == "train"
        shard = np.where(is_train, (h >> np.uint64(58)).astype(np.int64), -1)
        pos_key = np.where(
            is_train, (h & np.uint64((1 << 52) - 1)).astype(np.int64), -1
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    ids.astype(np.int64), pa.int64()
                ),
                "split": pa.array(split, pa.string()),
                "shard": pa.array(shard, pa.int64()),
                "pos_key": pa.array(pos_key, pa.int64()),
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        if int(g["shard"].iloc[0]) == -1:
            # the single non-train group: pos stays -1
            out = g[["doc_id", "split", "shard"]].copy()
            out["pos"] = np.int64(-1)
            return out
        g = g.sort_values(["pos_key", "doc_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "split": g["split"],
                "shard": g["shard"],
                "pos": np.arange(len(g), dtype=np.int64),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(signals, batch_format="pyarrow")
        .groupby("text_part")
        .map_groups(winners, batch_format="pandas")
        .map_batches(split_filter, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# PII redaction (round 4)
# ---------------------------------------------------------------------------

# RE2-only patterns (no backreferences/lookaround) so pyarrow's
# count_substring_regex / replace_substring_regex and DuckDB's
# regexp_replace(..., 'g') — both RE2 — produce byte-identical output.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_emails, n_phones, n_ips, redacted): PII redaction — the
    C4/CCNet-style privacy pass every public web-text recipe applies
    (emails -> [EMAIL], phone numbers -> [PHONE], IPv4 literals -> [IP]).

    The synthetic corpus carries no PII, so both engines first AUGMENT a
    deterministic fraction of documents with synthesized contact strings
    derived from doc_id (same construction in the DuckDB twin, so the
    redaction kernel — not the generator — is what the oracle checks;
    the multimodal header corpus uses the same device). Replacement order
    is fixed (email, phone, ip) because the email pattern would otherwise
    eat the host part of a later match.

    Scale shape: one stateless ``map_batches`` pass, three count + three
    replace RE2 kernels per batch — no shuffle, no state; streams at any
    corpus size.
    """

    def _mod(col, k: int):
        return pc.subtract(col, pc.multiply(pc.divide(col, k), k))

    def redact(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        sid = pc.cast(did, pa.string())
        empty = pa.scalar("")
        email_sfx = pc.if_else(
            pc.equal(_mod(did, 7), 0),
            pc.binary_join_element_wise(
                pa.scalar(" contact u"), sid, pa.scalar("@example.com"), empty
            ),
            empty,
        )
        phone_sfx = pc.if_else(
            pc.equal(_mod(did, 5), 0),
            pc.binary_join_element_wise(
                pa.scalar(" call 555-123-"),
                pc.utf8_lpad(pc.cast(_mod(did, 10000), pa.string()), 4, "0"),
                empty,
            ),
            empty,
        )
        ip_sfx = pc.if_else(
            pc.equal(_mod(did, 3), 0),
            pc.binary_join_element_wise(
                pa.scalar(" from 10."),
                pc.cast(_mod(did, 256), pa.string()),
                pa.scalar(".0."),
                pc.cast(_mod(pc.multiply(did, 7), 256), pa.string()),
                empty,
            ),
            empty,
        )
        text = pc.binary_join_element_wise(
            t["text"], email_sfx, phone_sfx, ip_sfx, empty
        )
        n_emails = pc.cast(pc.count_substring_regex(text, PII_EMAIL), pa.int64())
        red = pc.replace_substring_regex(text, PII_EMAIL, "[EMAIL]")
        n_phones = pc.cast(pc.count_substring_regex(red, PII_PHONE), pa.int64())
        red = pc.replace_substring_regex(red, PII_PHONE, "[PHONE]")
        n_ips = pc.cast(pc.count_substring_regex(red, PII_IP), pa.int64())
        red = pc.replace_substring_regex(red, PII_IP, "[IP]")
        return pa.table(
            {
                "doc_id": did,
                "n_emails": n_emails,
                "n_phones": n_phones,
                "n_ips": n_ips,
                "redacted": red,
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow"
    )


def mix_upsample(sf_dir: str) -> rd.Dataset:
    """(doc_id, source, copy, rep): integer upsample-to-balance source
    mixing — the epoch-style data-mixing rebalance (LLaMA/Pile recipes):
    every document of source ``s`` is repeated ``rep_s = max_n // n_s``
    times so each source contributes within 2x of the largest one, with a
    ``copy`` index distinguishing the repeats (a dataloader seeds per-copy
    shuffling/augmentation from it).

    Scale shape: per-source counts come from a partial pre-agg + one
    groupby over the tiny source domain (driver collect is O(sources));
    the repeat factors broadcast into a stateless vectorized
    ``np.repeat`` pass — text never moves, no row-explosion shuffle.
    """

    def counts_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "source": t["source"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ).group_by("source").aggregate([("n", "sum")])
        return g.rename_columns(["source", "n"])

    counts = (
        _read_docs(sf_dir, ["source"])
        .map_batches(counts_partial, batch_format="pyarrow")
        .groupby("source")
        .sum("n")
    ).take_all()  # bounded: one row per DISTINCT source
    n_by_src = {r["source"]: r["sum(n)"] for r in counts}
    max_n = max(n_by_src.values(), default=0)
    rep_by_src = {s: max_n // n for s, n in n_by_src.items()}
    rep_ref = ray.put(rep_by_src)

    class Repeat:
        def __init__(self):
            rep = ray.get(rep_ref)  # O(sources), once per actor
            self.src_arr = pa.array(list(rep.keys()), pa.string())
            self.rep_arr = np.fromiter(rep.values(), dtype=np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            # value_set is O(sources) — re-hashing it per batch is cheap,
            # unlike the corpus-sized _DimIndex cases
            pos = pc.index_in(t["source"], value_set=self.src_arr)
            reps = self.rep_arr[pos.to_numpy(zero_copy_only=False)]
            idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
            copy = np.arange(len(idx), dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps
            )
            out = t.select(["doc_id", "source"]).take(pa.array(idx))
            return out.append_column(
                "copy", pa.array(copy, pa.int64())
            ).append_column(
                "rep", pa.array(np.repeat(reps, reps), pa.int64())
            )

    return _read_docs(sf_dir, ["doc_id", "source"]).map_batches(
        Repeat, batch_format="pyarrow", concurrency=pool_size(), num_cpus=0.5
    )


def bpe_encode(sf_dir: str, n_merges: int = 8, check: bool = True) -> rd.Dataset:
    """(doc_id, n_bpe_tokens): per-document token count under the
    corpus-trained BPE tokenizer — :func:`bpe_train`'s companion (apply
    the merges, don't just learn them): the number a packing/cost
    estimator needs per document before any training run.

    Scale shape: the merges come from the distributed trainer; they are
    applied over the DISTINCT-word vocab Dataset (the corpus is touched
    once to build it, once to melt doc word counts — never per merge)
    with the same vectorized kernels as training. The per-word symbol
    lengths reach documents via ONE hash-partitioned ``Dataset.join`` on
    the word (never a vocabulary broadcast — the fluency rule), and the
    per-doc total is an integer aggregate. A per-doc sentinel row joined
    left_outer keeps zero-token documents in the output.

    Not SQL-expressible (iterative greedy rewriting); ``check=True``
    re-derives every distinct word's symbol count through the single-node
    reference trainer/encoder (vocab-bounded — gate scale only) and
    demands exact equality."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import clean_blocks

    merges_tbl = bpe_train(sf_dir, n_merges, check=False)
    merges = list(
        zip(merges_tbl["left"].to_pylist(), merges_tbl["right"].to_pylist())
    )

    vocab = clean_blocks(
        _read_docs(sf_dir, ["text"])
        .map_batches(_bpe_word_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(_bpe_init_syms, batch_format="pyarrow"),
        _BPE_VOCAB_SCHEMA,
    ).materialize()
    for left, right in merges:
        vocab = clean_blocks(
            vocab.map_batches(_bpe_apply_merge(left, right),
                              batch_format="pyarrow"),
            _BPE_VOCAB_SCHEMA,
        ).materialize()

    wlen_schema = pa.schema([("word", pa.string()), ("n_syms", pa.int64())])

    def word_len(t: pa.Table) -> pa.Table:
        syms = t["syms"].combine_chunks()
        lens = np.diff(syms.offsets.to_numpy()).astype(np.int64)
        return pa.table(
            {"word": t["word"], "n_syms": pa.array(lens, pa.int64())}
        )

    wlen = clean_blocks(
        vocab.map_batches(word_len, batch_format="pyarrow"), wlen_schema
    )

    if check:
        # exactness twin: reference-train + reference-encode every
        # distinct word (vocab-bounded collect — gate scale only)
        wc = {}
        for b in vocab.select_columns(["word", "n"]).iter_batches(
            batch_format="pyarrow"
        ):
            for w, n in zip(b["word"].to_pylist(), b["n"].to_pylist()):
                wc[w] = wc.get(w, 0) + n
        ref_vocab = {w: list(w) for w in wc}
        for left, right in merges:
            for w, syms in ref_vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                ref_vocab[w] = out
        got = {}
        for b in wlen.iter_batches(batch_format="pyarrow"):
            got.update(zip(b["word"].to_pylist(), b["n_syms"].to_pylist()))
        ref = {w: len(s) for w, s in ref_vocab.items()}
        if got != ref:
            diff = {w for w in ref if got.get(w) != ref[w]}
            raise AssertionError(
                f"distributed BPE encode diverged on {sorted(diff)[:5]}"
            )

    dw_schema = pa.schema(
        [("doc_id", pa.int64()), ("word", pa.string()), ("k", pa.int64())]
    )

    def doc_words(t: pa.Table) -> pa.Table:
        flat, row = _flat_tokens(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(flat):
            g = (
                pd.DataFrame({"doc_id": ids[row], "word": flat})
                .groupby(["doc_id", "word"], sort=False)
                .size()
                .reset_index(name="k")
            )
            counts = pa.table(
                {
                    "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                    "word": pa.array(g["word"].to_numpy(), pa.string()),
                    "k": pa.array(g["k"].to_numpy(np.int64)),
                }
            )
        else:
            counts = dw_schema.empty_table()
        # sentinel row per doc: survives the left_outer join with a null
        # n_syms, so zero-token docs stay in the output with count 0
        sentinel = pa.table(
            {
                "doc_id": t["doc_id"],
                "word": pa.array([""] * t.num_rows, pa.string()),
                "k": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )
        return pa.concat_tables([counts, sentinel]).combine_chunks()

    dw = clean_blocks(
        _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            doc_words, batch_format="pyarrow"
        ),
        dw_schema,
    )
    joined = dw.join(
        wlen,
        join_type="left_outer",
        num_partitions=join_parts(),
        on=("word",),
    )

    def partial(t: pa.Table) -> pa.Table:
        n_syms = pc.fill_null(t["n_syms"], 0)
        g = (
            pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_bpe_tokens": pc.multiply(t["k"], n_syms),
                }
            )
            .group_by("doc_id")
            .aggregate([("n_bpe_tokens", "sum")])
        )
        return g.rename_columns(["doc_id", "n_bpe_tokens"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_bpe_tokens", alias_name="n_bpe_tokens"))
    )


# splitmix64 finalizer constants (Steele et al., public domain) — a FULL
# bit mixer, not an affine map: the bottom-k of an affine hash over
# consecutive ids is a consecutive id run (three-distance equidistribution
# is NOT sequential independence), which a sample must never be
_SM64_ADD = 0x9E3779B97F4A7C15
_SM64_M1 = 0xBF58476D1CE4E5B9
_SM64_M2 = 0x94D049BB133111EB


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    z = x + np.uint64(_SM64_ADD)
    z ^= z >> np.uint64(30)
    z *= np.uint64(_SM64_M1)
    z ^= z >> np.uint64(27)
    z *= np.uint64(_SM64_M2)
    z ^= z >> np.uint64(31)
    return z


def hash_sample(sf_dir: str, k: int = 64) -> rd.Dataset:
    """(doc_id, h63): a deterministic uniform-without-replacement sample
    of ``k`` documents — the k smallest values of splitmix64(doc_id)
    (the classic priority-sample / bottom-k sketch, the distributed
    replacement for driver-side reservoir sampling). Stable under
    re-runs, resharding and corpus growth pressure-points: adding docs
    can only displace, never reorder, survivors. The mixer is the full
    splitmix64 finalizer, NOT the affine maps the split/shard ops use:
    an affine bottom-k over consecutive ids degenerates to a consecutive
    id run, and the SQL twin reproduces every xor/shift/mulmod exactly
    in HUGEINT arithmetic (hi/lo-split multiply mod 2^64).

    Scale shape: each batch pre-selects its own k smallest hashes
    (vectorized argpartition), so the global sort/limit runs over at most
    k rows PER BLOCK, never the corpus; no other shuffle exists. The h63
    column (top 63 hash bits, int64-safe) makes the draw auditable and
    gives the SQL twin an exact ORDER BY key."""

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(ids)
        h63 = (h >> np.uint64(1)).astype(np.int64)
        if len(ids) > k:
            keep = np.argpartition(h63, k)[:k]
            ids, h63 = ids[keep], h63[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "h63": pa.array(h63, pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["h63", "doc_id"])
        .limit(k)
    )


def code_score(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_chars, n_symbols, n_indent_lines, score_4096, is_code):
    code-vs-prose detection — the curation signal that routes documents
    to a code pipeline vs a prose pipeline (StarCoder/Pile-style corpus
    splitting): density of code punctuation ({}();=[]) plus
    indented-line counts, thresholded into an integer flag. score_4096 =
    4096 * n_symbols // n_chars (the 4096ths convention — no float ever
    leaves the operator).

    The synthetic corpus is prose-only, so both engines first AUGMENT a
    deterministic fraction (doc_id % 4 == 0) with a doc_id-derived code
    snippet — the pii_scrub device: the generator is shared, the KERNEL
    is what the oracle checks.

    Scale shape: one stateless map_batches pass, three counting kernels
    per batch — no shuffle, no state; streams at any corpus size."""

    def _mod(col, k: int):
        return pc.subtract(col, pc.multiply(pc.divide(col, k), k))

    def score(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        sid = pc.cast(did, pa.string())
        empty = pa.scalar("")
        nl = "\n"
        snippet = pc.if_else(
            pc.equal(_mod(did, 4), 0),
            pc.binary_join_element_wise(
                pa.scalar(f"{nl}def f"), sid, pa.scalar(f"(x) {{{nl}"),
                pa.scalar("    return x + "), sid,
                pa.scalar(f";{nl}}}"), empty,
            ),
            empty,
        )
        text = pc.binary_join_element_wise(t["text"], snippet, empty)
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_symbols = pc.cast(
            pc.count_substring_regex(text, r"[{}();=\[\]]"), pa.int64()
        )
        # an indented line = newline followed by 4 spaces (plain substring
        # count — identical bytes on both engines, no multiline-regex
        # dialect risk)
        n_indent = pc.cast(
            pc.count_substring(text, "\n    "), pa.int64()
        )
        score_4096 = pc.divide(
            pc.multiply(n_symbols, 4096), pc.max_element_wise(n_chars, 1)
        )
        return pa.table(
            {
                "doc_id": did,
                "n_chars": n_chars,
                "n_symbols": n_symbols,
                "n_indent_lines": n_indent,
                "score_4096": score_4096,
                "is_code": pc.cast(
                    pc.greater_equal(score_4096, 64), pa.int64()
                ),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def ttr(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_types, ttr_4096): per-document type-token
    ratio — the lexical-diversity quality signal (low TTR flags
    keyword-stuffed / template pages in web-corpus filtering), reported
    in integer 4096ths so no float leaves the operator.

    Tokenization is the shared \\S+ contract (split on whitespace, drop
    empties — identical to the vocab/bigram family and its SQL twin).
    Scale shape: one stateless map_batches pass; the per-doc distinct
    count is a batch-local C hash aggregation over (doc_id, token) —
    every token of a document lives in its row, so no shuffle ever."""

    def per_doc(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(t["text"], r"\s+")
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        rep = np.repeat(did, lens)
        keep = pc.not_equal(flat, "")
        pairs = pa.table(
            {"doc_id": pa.array(rep, pa.int64()), "token": flat}
        ).filter(keep)
        tot = pairs.group_by("doc_id").aggregate([("token", "count")])
        typ = (
            pairs.group_by(["doc_id", "token"]).aggregate([])
            .group_by("doc_id").aggregate([("token", "count")])
        )
        # map both (keyed by doc_id, only docs with >=1 token) back onto
        # the batch's row order; zero-token docs stay at 0
        n_tok = np.zeros(len(did), np.int64)
        n_typ = np.zeros(len(did), np.int64)
        order = np.argsort(did, kind="stable")
        sorted_ids = did[order]
        for tbl, out in ((tot, n_tok), (typ, n_typ)):
            k = tbl["doc_id"].to_numpy(zero_copy_only=False)
            v = tbl.column(1).to_numpy(zero_copy_only=False)
            pos = order[np.searchsorted(sorted_ids, k)]
            out[pos] = v
        ttr_4096 = 4096 * n_typ // np.maximum(n_tok, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_types": pa.array(n_typ, pa.int64()),
                "ttr_4096": pa.array(ttr_4096, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow"
    )


def readability(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_words, n_sentences, n_syllables, fk_grade_1000):
    integer Flesch-Kincaid-style readability — the classic prose-quality
    gate (a C4/Gopher-adjacent signal for dropping word-salad or
    machine-generated pages). Syllables are the standard vowel-run
    approximation ([aeiouy]+ runs, lowercased); sentences are terminal
    punctuation runs ([.!?]+). Grade in integer thousandths:

        fk_1000 = (390*w*w1 + 11800*sy*s1) // (s1*w1) - 15590

    with w1 = max(w, 1), s1 = max(s, 1) — one fused non-negative floor
    division, bit-identical in DuckDB. One stateless map_batches pass,
    three RE2 counting kernels per batch; streams at any corpus size."""

    def per_doc(t: pa.Table) -> pa.Table:
        text = t["text"]
        w = pc.count_substring_regex(text, r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        s = pc.count_substring_regex(text, r"[.!?]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sy = pc.count_substring_regex(
            pc.utf8_lower(text), r"[aeiouy]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        w1 = np.maximum(w, 1)
        s1 = np.maximum(s, 1)
        fk = (390 * w * w1 + 11800 * sy * s1) // (s1 * w1) - 15590
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(w, pa.int64()),
                "n_sentences": pa.array(s, pa.int64()),
                "n_syllables": pa.array(sy, pa.int64()),
                "fk_grade_1000": pa.array(fk, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow"
    )


def vocab_growth(
    sf_dir: str,
    thresholds: tuple = (16, 64, 256, 1024, 4096, 16384, 65536, 262144),
) -> pa.Table:
    """(threshold, vocab_size): Heaps'-law vocabulary growth — how many
    distinct tokens (raw \\S+, the vocab_topk contract) appear among the
    first ``threshold`` documents (doc_id < threshold), for a ladder of
    thresholds. The curve every tokenizer-budget decision reads: where
    vocabulary growth flattens is where a bigger corpus stops buying new
    types.

    Cumulative distinct looks inherently sequential; it isn't — the trick
    is per-TOKEN first occurrence: vocab_size(T) = |{token : min doc_id
    over its occurrences < T}|. One coarse-hash grouped MIN over (token,
    doc_id) partials (token cardinality scales with the corpus — the
    cost rule), then a per-batch bincount over the threshold ladder and a
    driver cumsum over <= |ladder|+1 rows. The full curve costs one
    corpus pass regardless of ladder length.
    """
    from ray.data.aggregate import Sum

    from raycrawl.pipelines.dedup import coarse_min, coarse_parts

    thr = np.asarray(sorted(thresholds), np.int64)

    def partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(t["text"], r"\s+")
        n_per = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        docs = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            n_per,
        )
        tb = pa.table(
            {"token": flat, "fd": pa.array(docs, pa.int64())}
        ).filter(pc.not_equal(flat, ""))
        g = tb.group_by("token").aggregate([("fd", "min")])
        return g.rename_columns(["token", "fd"])

    first = coarse_min(
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow"),
        ["token"], ["fd"], coarse_parts(sf_dir) - 1,
    )

    def bucket(df) -> "pd.DataFrame":
        import pandas as pd

        # bucket j = first ladder rung ABOVE fd; tokens with fd >= every
        # rung fall past the ladder and never count
        idx = np.searchsorted(thr, df["fd"].to_numpy(np.int64),
                              side="right")
        c = np.bincount(idx, minlength=len(thr) + 1)[: len(thr)]
        return pd.DataFrame(
            {"b": np.arange(len(thr), dtype=np.int64),
             "n": c.astype(np.int64)}
        )

    rows = (
        first.map_batches(bucket, batch_format="pandas")
        .groupby("b")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded by the ladder length
    )
    counts = np.zeros(len(thr), np.int64)
    for r in rows:
        counts[int(r["b"])] = int(r["n"])
    return pa.table(
        {
            "threshold": pa.array(thr, pa.int64()),
            "vocab_size": pa.array(np.cumsum(counts), pa.int64()),
        }
    )


def lang_source_drift(sf_dir: str) -> pa.Table:
    """(lang, source, n_docs, ratio_4096): the language x source mixing
    cross-tab with each cell's observed/expected ratio under independence
    in integer 4096ths (4096 = exactly the rate the marginals predict) —
    the data-mixing drift audit that catches one feed silently changing
    language composition.

    Scale shape: cell counts via per-batch partials into a (lang x
    source)-domain-bounded native aggregate; marginals derive from the
    cell table on the driver (O(domain) rows); ratio = n * O * 4096 //
    (R * C), exact integers end to end.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["lang", "source"])
            .group_by(["lang", "source"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "source", "n"])

    cells = (
        _read_docs(sf_dir, ["lang", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .take_all()  # bounded by the lang x source domain
    )
    lang_tot: dict = {}
    src_tot: dict = {}
    total = 0
    for r in cells:
        lang_tot[r["lang"]] = lang_tot.get(r["lang"], 0) + r["n_docs"]
        src_tot[r["source"]] = src_tot.get(r["source"], 0) + r["n_docs"]
        total += r["n_docs"]
    rows = sorted(cells, key=lambda r: (r["lang"], r["source"]))
    return pa.table(
        {
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_docs": pa.array(
                [int(r["n_docs"]) for r in rows], pa.int64()
            ),
            "ratio_4096": pa.array(
                [
                    total * int(r["n_docs"]) * 4096
                    // (lang_tot[r["lang"]] * src_tot[r["source"]])
                    for r in rows
                ],
                pa.int64(),
            ),
        }
    )
