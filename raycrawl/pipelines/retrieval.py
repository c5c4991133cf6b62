"""Text retrieval / cross-document duplication analysis over `documents`.

Two training-data operators the crawl reference lacks but a 100-TB text
pipeline needs, both with exact DuckDB oracle twins:

- :func:`docs_tfidf_topk` — keyword retrieval: integer-scaled TF-IDF
  scoring of every document against a fixed query-term set, top-k by
  score. The scale shape is the classic two-pass plan: a corpus pass
  reduces to per-term document frequencies (output bounded by |query
  terms|), the weights broadcast via ``ray.put``, and the scoring pass is
  embarrassingly parallel with a distributed sort+limit at the end.
- :func:`docs_dup_ngrams` — the exact-substring-duplication signal from
  "Deduplicating Training Data Makes Language Models Better" (Lee et al.
  2022), at token-n-gram granularity: for every document, how many of its
  n-gram positions are covered by grams that also appear in ANOTHER
  document. Plan: per-batch (gram, doc, positions) partials, one shuffle
  on a coarse gram-hash partition to find cross-document grams, one
  shuffle by doc to re-aggregate. Gram keys here ship as strings to keep
  the oracle exact; the 100-TB variant ships a 128-bit gram hash instead
  (same plan, ~10x smaller exchange).

Tokenization is textops._flat_tokens (lower + \\s+ split, empties
dropped) — THE shared contract every n-gram oracle mirrors in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from raycrawl.pipelines.dedup import coarse_parts
from raycrawl.pipelines.relops import pool_size
from raycrawl.pipelines.textops import _flat_tokens, _read_docs, _shingles

__all__ = [
    "docs_tfidf_topk",
    "docs_bm25_topk",
    "docs_dup_ngrams",
    "docs_postings",
    "docs_phrase_search",
    "TFIDF_TERMS",
    "TFIDF_SCALE",
]

# fixed query-term set (mid-frequency corpus vocabulary) and the integer
# idf scale: w(term) = (n_docs * TFIDF_SCALE) // df(term) — an integer
# inverse-document-frequency, exactly reproducible in BIGINT SQL (a float
# log-idf would hash-drift; the ranking behavior is the same monotone
# decreasing-in-df weighting)
TFIDF_TERMS = ("hash", "join", "sort", "vector")
TFIDF_SCALE = 1_000_000


def _term_counts(t: pa.Table, terms) -> np.ndarray:
    """(len(terms), n_rows) occurrence counts via one flatten + one
    membership pass per term (C-level object compare + bincount)."""
    flat, trow = _flat_tokens(t)
    out = np.zeros((len(terms), len(t)), np.int64)
    for i, term in enumerate(terms):
        hit = flat == term
        if hit.any():
            out[i] = np.bincount(trow[hit], minlength=len(t))
    return out


def docs_tfidf_topk(
    sf_dir: str, k: int = 20, terms: tuple = TFIDF_TERMS
) -> rd.Dataset:
    """(doc_id, score): top-k documents by integer TF-IDF against ``terms``.

    score(doc) = sum over query terms of tf(term, doc) * w(term), with
    w(term) = (n_docs * TFIDF_SCALE) // df(term). Pass 1 reduces the
    corpus to |terms| (term, df) rows (per-batch partials, driver-side
    final sum over a batch-count-bounded table); pass 2 scores each batch
    against the broadcast weight vector and a distributed sort+limit picks
    the top k (ties broken by doc_id)."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def df_partial(t: pa.Table) -> pa.Table:
        counts = _term_counts(t, terms)
        return pa.table(
            {
                "term": pa.array(list(terms), pa.string()),
                "df": pa.array((counts > 0).sum(axis=1), pa.int64()),
            }
        )

    df = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |terms| rows per batch
        .groupby("term")["df"].sum()
    )
    weights = {
        t: (n_docs * TFIDF_SCALE) // int(df[t]) for t in terms if df.get(t, 0)
    }
    w_ref = ray.put(weights)

    class Score:
        def __init__(self):
            self.terms = list(ray.get(w_ref).items())  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            counts = _term_counts(t, [term for term, _ in self.terms])
            w = np.array([wt for _, wt in self.terms], np.int64)
            score = (counts * w[:, None]).sum(axis=0)
            keep = np.flatnonzero(score > 0)
            return pa.table(
                {
                    "doc_id": t["doc_id"].take(pa.array(keep)),
                    "score": pa.array(score[keep], pa.int64()),
                }
            )

    return (
        docs.map_batches(Score, batch_format="pyarrow", concurrency=pool_size(),
                         num_cpus=0.5)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def docs_postings(sf_dir: str) -> rd.Dataset:
    """(token, doc_id, tf): the full inverted-index postings table —
    search-index construction as a dataflow.

    Each document is one row, so per-batch (doc, token) counts are already
    the global term frequencies (no merge shuffle needed); the ONE
    all-to-all is the distributed sort by (token, doc_id) that
    range-partitions the postings — the layout a term-lookup service
    actually serves (a block per token range, doc ids ordered within).
    Tokenization is raw ``\\S+`` extraction — the vocab_topk contract, not
    the lowercased n-gram one."""

    def postings(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(t["text"], r"\s+").combine_chunks()
        flat = lists.flatten().to_numpy(zero_copy_only=False)
        offs = lists.offsets.to_numpy()
        trow = np.repeat(np.arange(len(t)), np.diff(offs))
        keep = flat != ""
        flat, trow = flat[keep], trow[keep]
        if not len(flat):
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        codes, uniques = pd.factorize(flat)
        k_t = len(uniques)
        key = trow.astype(np.int64) * k_t + codes
        uk, tf = np.unique(key, return_counts=True)
        urow, ucode = uk // k_t, uk % k_t
        return pa.table(
            {
                "token": pa.array(np.asarray(uniques, object)[ucode],
                                  pa.string()),
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)[urow],
                    pa.int64(),
                ),
                "tf": pa.array(tf, pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(postings, batch_format="pyarrow")
        .sort(["token", "doc_id"])
    )


def docs_dup_ngrams(sf_dir: str, n: int = 5,
                    parts: int | None = None) -> rd.Dataset:
    """(doc_id, n_shared_grams, n_shared_positions): per document, the
    distinct token n-grams (and total gram positions) it shares with at
    least one OTHER document — the cross-document exact-duplication signal
    (Lee et al. 2022) a substring-dedup pass thresholds on.

    Plan: each document is one row, so a per-batch (doc, gram) unique
    reduce is already globally per-doc unique; batches emit (gram, doc_id,
    n_pos) partial rows keyed by a coarse gram-hash partition. ONE shuffle
    groups grams; a vectorized pandas pass per partition keeps rows of
    grams seen in >= 2 documents. A second (tiny) shuffle re-aggregates by
    doc. Documents with no shared grams are absent from the output (the
    oracle filters identically)."""
    if parts is None:
        # corpus-size-derived width (see dedup.coarse_parts): the
        # per-partition pandas frame must not grow with the corpus
        parts = coarse_parts(sf_dir)

    def gram_rows(t: pa.Table) -> pa.Table:
        g, grow = _shingles(*_flat_tokens(t), n)
        if not len(g):
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_pos": pa.array([], pa.int64()),
                    "gpart": pa.array([], pa.int64()),
                }
            )
        codes, uniques = pd.factorize(g)
        k_g = len(uniques)
        key = grow.astype(np.int64) * k_g + codes
        uk, n_pos = np.unique(key, return_counts=True)
        urow, ucode = uk // k_g, uk % k_g
        grams = np.asarray(uniques, object)[ucode]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[urow]
        # partition key: any deterministic gram hash works (it never
        # reaches the output); pandas' siphash is vectorized C
        gpart = (pd.util.hash_array(grams) % parts).astype(np.int64)
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_pos": pa.array(n_pos, pa.int64()),
                "gpart": pa.array(gpart, pa.int64()),
            }
        )

    def shared_only(g: pd.DataFrame) -> pd.DataFrame:
        # one C-speed pass: per-gram row count == distinct-doc count
        # (rows are per-(doc, gram) by construction)
        sizes = g.groupby("gram", sort=False)["doc_id"].transform("size")
        out = g.loc[sizes >= 2, ["doc_id", "n_pos"]].copy()
        out["one"] = np.int64(1)
        return out

    def doc_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("n_pos", "sum"), ("one", "sum")])
        return g.rename_columns(
            [
                {"n_pos_sum": "n_shared_positions", "one_sum": "n_shared_grams"}
                .get(c, c)
                for c in g.column_names
            ]
        )

    per_doc = (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(shared_only, batch_format="pandas")
        .map_batches(doc_partial, batch_format="pyarrow")
    )
    from raycrawl.pipelines.dedup import coarse_sum

    return coarse_sum(
        per_doc, ["doc_id"], ["n_shared_grams", "n_shared_positions"],
        coarse_parts(sf_dir) - 1,
    )


# ---------------------------------------------------------------------------
# round 4: integer-exact BM25 top-k
# ---------------------------------------------------------------------------

# BM25 constants k1=1.2, b=0.75 multiplied through by their common
# denominators so every operation is integer floor division (exactly
# reproducible in BIGINT SQL):
#   tfn = tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl),  avgdl = T/N
#       = 44*T*tf / (20*T*tf + 6*T + 18*dl*N)
# idf is the Robertson rational form (N-df+1)/(df+1), floor-scaled.
BM25_SCALE = 4096


def docs_bm25_topk(
    sf_dir: str, k: int = 20, terms: tuple = TFIDF_TERMS
) -> rd.Dataset:
    """(doc_id, score): top-k documents by integer-exact BM25 against
    ``terms``.

    score(doc) = sum over query terms of idf_int(term) * tfn_int(term,doc)
    with idf_int = ((N - df + 1) * 4096) // (df + 1) and tfn_int =
    (44*T*tf*4096) // (20*T*tf + 6*T + 18*dl*N) — the k1=1.2/b=0.75 BM25
    saturation multiplied through by common denominators, so both factors
    are single floor divisions over positive integers (numpy ``//`` ==
    DuckDB ``//``; tfn_int is bounded by 44*4096/20 ≈ 9011, so the final
    product stays far inside int64 at any gate scale — a true-100-TB
    deployment would run the SAME two-pass plan with int128/float
    scoring).

    Plan (identical shape to :func:`docs_tfidf_topk`): pass 1 reduces the
    corpus to |terms| document frequencies plus the corpus token total
    (per-batch partials, driver sum bounded by batches x terms); the
    integer weights broadcast via ``ray.put``; pass 2 scores each batch
    vectorized (one tokenization, per-term bincounts, one fused integer
    expression) and a distributed sort+limit picks the top k.
    """
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def df_partial(t: pa.Table) -> pa.Table:
        flat, trow = _flat_tokens(t)
        dfs = []
        for term in terms:
            hit = flat == term
            dfs.append(
                int((np.bincount(trow[hit], minlength=len(t)) > 0).sum())
                if hit.any()
                else 0
            )
        return pa.table(
            {
                "term": pa.array(list(terms) + ["\x00ntok"], pa.string()),
                "df": pa.array(dfs + [len(flat)], pa.int64()),
            }
        )

    agg = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: (|terms|+1) rows per batch
        .groupby("term")["df"].sum()
    )
    t_total = int(agg["\x00ntok"])
    idf = {
        term: ((n_docs - int(agg[term]) + 1) * BM25_SCALE)
        // (int(agg[term]) + 1)
        for term in terms
        if agg.get(term, 0)
    }
    w_ref = ray.put((idf, t_total, n_docs))

    class Score:
        def __init__(self):
            self.idf, self.t_total, self.n_docs = ray.get(w_ref)
            self.terms = list(self.idf)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            flat, trow = _flat_tokens(t)
            dl = np.bincount(trow, minlength=len(t)).astype(np.int64)
            T, N = self.t_total, self.n_docs
            score = np.zeros(len(t), np.int64)
            denom_base = 6 * T + 18 * dl * N
            for term in self.terms:
                hit = flat == term
                tf = (
                    np.bincount(trow[hit], minlength=len(t)).astype(np.int64)
                    if hit.any()
                    else np.zeros(len(t), np.int64)
                )
                tfn = (44 * T * tf * BM25_SCALE) // np.maximum(
                    20 * T * tf + denom_base, 1
                )
                score += self.idf[term] * tfn
            keep = np.flatnonzero(score > 0)
            return pa.table(
                {
                    "doc_id": t["doc_id"].take(pa.array(keep)),
                    "score": pa.array(score[keep], pa.int64()),
                }
            )

    return (
        docs.map_batches(Score, batch_format="pyarrow", concurrency=pool_size(),
                         num_cpus=0.5)
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


PHRASE = ("hash", "join")


def docs_phrase_search(sf_dir: str, phrase: tuple = PHRASE) -> rd.Dataset:
    """(doc_id, n_hits, first_pos): exact-phrase retrieval — documents
    containing ``phrase`` as CONSECUTIVE tokens, with the occurrence count
    and the 0-based token position of the first hit (what a search engine
    returns for a quoted query, and what a positional index exists for).

    Plan: a document lives wholly in one row, so phrase matching is
    embarrassingly parallel — ONE pass, no shuffle, no index build: the
    batch's texts flatten to (token, row) arrays (textops._flat_tokens,
    the shared lowercase n-gram contract) and the phrase test is a
    vectorized shifted-slice conjunction (token[i] == w0 & token[i+1] ==
    w1 & same row), generalizing to any phrase length as len(phrase)-1
    shifted compares. Hit positions fall out of the same pass by
    subtracting each row's start offset. Contrast :func:`docs_postings` —
    THAT is the materialized-index route; for a fixed query over the
    corpus, the single scan is the cheaper plan at any scale."""
    w = [p.lower() for p in phrase]
    assert len(w) >= 2

    def hits(t: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_id", pa.int64()), ("n_hits", pa.int64()),
             ("first_pos", pa.int64())]
        ).empty_table()
        if t.num_rows == 0:
            return empty
        flat, trow = _flat_tokens(t)
        n = len(flat) - (len(w) - 1)
        if n <= 0:
            return empty
        m = flat[:n] == w[0]
        for j in range(1, len(w)):
            m &= flat[j:n + j] == w[j]
        m &= trow[:n] == trow[len(w) - 1:n + len(w) - 1]
        idx = np.flatnonzero(m)
        if not len(idx):
            return empty
        rows = trow[idx]
        # 0-based in-row token position: global index minus the row's
        # first-token offset (trow is sorted ascending)
        row_start = np.searchsorted(trow, np.arange(t.num_rows))
        pos = idx - row_start[rows]
        uniq, first = np.unique(rows, return_index=True)
        counts = np.bincount(rows)[uniq]
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(uniq)),
                "n_hits": pa.array(counts, pa.int64()),
                "first_pos": pa.array(pos[first], pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        hits, batch_format="pyarrow")
