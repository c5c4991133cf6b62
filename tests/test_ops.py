"""Unit tests for the training-data operator families (planted-truth
corpora: dedup finds exactly what was planted; ANN matches exact numpy)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    """documents.parquet with exact dups, near dups, and unrelated docs."""
    d = tmp_path_factory.mktemp("planted")
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy dog", "sleepy dog")  # high jaccard
    docs = [
        (0, base, "en"),
        (1, base, "en"),             # exact dup of 0
        (2, near, "en"),             # near dup of 0/1
        (3, "completely different words about spark and arrow tables", "en"),
        (4, "another unrelated document mentioning ray data pipelines", "en"),
        (5, base, "en"),             # exact dup of 0
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d0 for d0, _, _ in docs], pa.int64()),
                "text": pa.array([t for _, t, _ in docs]),
                "lang": pa.array([l for _, _, l in docs]),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array([len(t) for _, t, _ in docs], pa.int64()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


def test_exact_dedup_planted(ray_session, planted_docs):
    from raycrawl.pipelines.dedup import exact_dedup

    out = exact_dedup(planted_docs).to_pandas().set_index("keep_id")
    assert out.loc[0, "n_dups"] == 3          # docs 0,1,5
    assert set(out.index) == {0, 2, 3, 4}


def test_minhash_lsh_planted(ray_session, planted_docs):
    from raycrawl.pipelines.dedup import jaccard, minhash_lsh_pairs, shingles

    pairs = minhash_lsh_pairs(planted_docs, threshold=0.5).to_pandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # all pairs among {0,1,2,5} are near/exact dups; nothing else
    expected = {(0, 1), (0, 2), (0, 5), (1, 2), (1, 5), (2, 5)}
    assert got == expected
    # verification stage really is exact jaccard
    for a, b in got:
        pass
    assert jaccard(shingles("a b c d"), shingles("a b c d")) == 1.0


def test_ngram_jaccard_planted(ray_session, planted_docs):
    from raycrawl.pipelines.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(planted_docs, threshold=0.5).to_pandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # prefix filtering must find exactly what minhash+verify finds here
    assert got == {(0, 1), (0, 2), (0, 5), (1, 2), (1, 5), (2, 5)}


def test_ngram_jaccard_matches_bruteforce(ray_session, tmp_path):
    """Recall is exact BY CONSTRUCTION (prefix lemma): every J>=t pair of a
    high-collision random corpus must come back, nothing else."""
    from raycrawl.pipelines.dedup import jaccard, ngram_jaccard_pairs, shingles

    rng = np.random.RandomState(5)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [
        " ".join(rng.choice(vocab, rng.randint(0, 12))) for _ in range(60)
    ]
    texts += [texts[0], "", texts[3], "one two"]  # dups, empty, short doc
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    got = ngram_jaccard_pairs(str(tmp_path), threshold=0.5).to_pandas()
    got_pairs = {tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)}
    sets = [shingles(t, 3) for t in texts]
    brute = {
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if sets[i] and sets[j] and jaccard(sets[i], sets[j]) >= 0.5
    }
    assert got_pairs == brute


def test_simhash_planted(ray_session, planted_docs):
    from raycrawl.pipelines.dedup import simhash64, simhash_pairs

    pairs = simhash_pairs(planted_docs, max_hamming=3).to_pandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # exact dups are hamming 0; they must all be found
    assert {(0, 1), (0, 5), (1, 5)} <= got
    assert simhash64("hello world") == simhash64("hello world")
    # unrelated docs differ
    assert (3, 4) not in got


def test_dedup_clusters_planted(ray_session, planted_docs):
    from raycrawl.pipelines.dedup import dedup_clusters

    out = dedup_clusters(planted_docs).to_pandas().set_index("doc_id")["cluster_id"]
    # docs 0,1,2,5 form one near-dup component labeled by its min id
    assert out[0] == out[1] == out[2] == out[5] == 0
    assert out[3] == 3 and out[4] == 4  # singletons label themselves


def test_dedup_survivors_planted(ray_session, planted_docs):
    from raycrawl.pipelines.dedup import dedup_survivors

    kept = sorted(
        dedup_survivors(planted_docs).to_pandas()["doc_id"].tolist()
    )
    # one canonical doc (min id) for the 0/1/2/5 component + the singletons
    assert kept == [0, 3, 4]


def test_dedup_clusters_modes_agree_on_chain(ray_session, tmp_path):
    """Driver union-find and distributed min-label propagation must produce
    identical labels — exercised on a long dup-CHAIN (worst case for label
    propagation: convergence takes diameter-many rounds, not one)."""
    import ray.data as rd

    from raycrawl.pipelines.dedup import dedup_clusters

    # chain components: i <-> i+1 for runs of 6, plus singletons
    pairs = [(i, i + 1) for i in range(0, 30) if (i + 1) % 6 != 0]
    pairs_ds = rd.from_items([{"id_a": a, "id_b": b} for a, b in pairs])
    docs = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(40)]),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(["s"] * 40),
            "n_chars": pa.array([5] * 40, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))

    def run(mode):
        pairs2 = rd.from_items([{"id_a": a, "id_b": b} for a, b in pairs])
        out = dedup_clusters(str(tmp_path), pairs_ds=pairs2, mode=mode)
        return out.to_pandas().set_index("doc_id")["cluster_id"].sort_index()

    drv = run("driver")
    dist = run("distributed")
    pd.testing.assert_series_equal(drv, dist, check_dtype=False)
    # each chain of 6 is labeled by its minimum; others label themselves
    assert drv[5] == 0 and drv[11] == 6 and drv[29] == 24
    assert all(drv[i] == i for i in range(30, 40))


def test_dedup_clusters_pointer_doubling_deep_path(ray_session, tmp_path):
    """Path graph with diameter 39: per-hop propagation alone needs ~40
    rounds, so an 8-round budget proves the pointer-doubling hop is doing
    the O(log d) work (round-3 code raises RuntimeError here)."""
    import ray.data as rd

    from raycrawl.pipelines.dedup import dedup_clusters

    n = 40
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(n)]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([6] * n, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    pairs_ds = rd.from_items([{"id_a": i, "id_b": i + 1} for i in range(n - 1)])
    out = dedup_clusters(
        str(tmp_path), pairs_ds=pairs_ds, mode="distributed", max_iters=8
    )
    lab = out.to_pandas().set_index("doc_id")["cluster_id"].sort_index()
    assert (lab == 0).all()


def test_crawl_components_pointer_doubling_deep_chain(ray_session):
    """Same diameter-39 path through the message-passing components op:
    the doubling requests must converge it within 8 rounds."""
    import ray.data as rd

    from raycrawl.pipelines.crawlqueries import crawl_components

    n = 40
    urls = [f"https://deep.example.com/p{i:03d}" for i in range(n)]
    edges = rd.from_items(
        [{"src": urls[i], "dst": urls[i + 1]} for i in range(n - 1)]
    )
    nodes = rd.from_items([{"url": u} for u in urls])
    out = crawl_components("/unused", max_iters=8, graph=(edges, nodes))
    got = out.to_pandas().set_index("url")["component"]
    assert len(got) == n and (got == urls[0]).all()


def test_embedding_near_dup_matches_numpy(ray_session):
    from raycrawl.pipelines.dedup import embedding_near_dup

    got = embedding_near_dup(SF, threshold=0.3).to_pandas()
    got_pairs = {tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)}

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.array(t["vec_id"].to_pylist())
    labels = np.array(t["label"].to_pylist())
    expected = set()
    for l in np.unique(labels):
        sel = labels == l
        sub, sid = m[sel], ids[sel]
        order = np.argsort(sid)
        sub, sid = sub[order], sid[order]
        s = sub @ sub.T
        ia, ib = np.nonzero(np.triu(s >= 0.3, k=1))
        expected |= {(int(sid[a]), int(sid[b])) for a, b in zip(ia, ib)}
    assert got_pairs == expected


def test_embedding_lsh_blocking(ray_session):
    """The unlabeled-data scale path: LSH sign-bucket blocking must emit
    only TRUE pairs (precision 1 — every candidate is exactly verified)
    at >=0.9 recall vs the brute-force all-pairs truth. Threshold 0.3 is
    a LOOSE bar (theta 72deg), so the planes-per-table count drops to 2
    (per-pair recall 1-(1-0.6^2)^12 ~= 0.995; the 4-plane default is
    sized for real near-dup thresholds >=0.9 — measured 0.843 here)."""
    from raycrawl.pipelines.dedup import embedding_near_dup

    got = embedding_near_dup(
        SF, threshold=0.3, blocking="lsh", n_planes=2
    ).to_pandas()
    got_pairs = {tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)}

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    ids = np.array(t["vec_id"].to_pylist())
    order = np.argsort(ids)
    ids = ids[order]
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)[order]
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ia, ib = np.nonzero(np.triu(m @ m.T >= 0.3, k=1))
    truth = {(int(ids[a]), int(ids[b])) for a, b in zip(ia, ib)}

    assert got_pairs <= truth  # exact verify => no false pairs, ever
    assert truth  # corpus actually has near-dup pairs
    recall = len(got_pairs) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(truth)} true)"


def test_ann_brute_matches_numpy(ray_session):
    from raycrawl.pipelines.ann import brute_force_topk

    got = brute_force_topk(SF, n_queries=3, k=5).to_pandas()
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"))
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.array(t["vec_id"].to_pylist())
    order = np.argsort(ids)
    m, ids = m[order], ids[order]
    for q in range(3):
        sims = m[q] @ m.T
        df = pd.DataFrame({"vec_id": ids, "sim": sims})
        df = df[df.vec_id != q].sort_values(
            ["sim", "vec_id"], ascending=[False, True]
        ).head(5)
        expect = df["vec_id"].tolist()
        ours = got[got.query_id == q].sort_values("rank")["vec_id"].tolist()
        assert ours == expect, q


def test_ann_lsh_recall(ray_session):
    from raycrawl.pipelines.ann import brute_force_topk, lsh_topk

    exact = brute_force_topk(SF, n_queries=5, k=10).to_pandas()
    approx = lsh_topk(SF, n_queries=5, k=10).to_pandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    # tuned 4 planes x 24 tables measure 0.98-1.0 recall on the sf corpora
    # (random 64-dim data — the weakest neighbor structure possible)
    assert recall >= 0.8
    assert len(a) <= len(e)  # never more than k per query


def test_ann_ivf_recall(ray_session):
    from raycrawl.pipelines.ann import brute_force_topk, ivf_topk

    exact = brute_force_topk(SF, n_queries=5, k=10).to_pandas()
    approx = ivf_topk(SF, n_queries=5, k=10).to_pandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    # tuned probe 5 of 6 lists measures 0.94 recall at sf0.01 AND sf0.1
    # (recall tracks scan fraction on cluster-free random embeddings)
    assert recall >= 0.8
    assert len(a) <= len(e)


def test_resumable_sink_skips_committed_shards(ray_session, tmp_path):
    """Crash-resume semantics: only the shard whose marker is missing is
    re-done; uncommitted shards are invisible to readers."""
    import pyarrow.compute as pc

    from raycrawl.pipelines.sink import (
        read_partitioned,
        resumable_transform_write,
        shard_key,
    )

    src = tmp_path / "in"
    out = tmp_path / "out"
    log = tmp_path / "log"
    for p in (src, log):
        p.mkdir()
    for i in range(3):
        pq.write_table(
            pa.table({"doc_id": [10 * i, 10 * i + 1], "text": ["a", "b"]}),
            str(src / f"f{i}.parquet"),
        )

    logdir = str(log)

    def fn(t):
        with open(os.path.join(logdir, f"ran_{t['doc_id'][0].as_py()}"), "w"):
            pass
        return t.set_column(
            t.schema.get_field_index("text"), "text",
            pc.utf8_upper(t["text"]),
        )

    r1 = resumable_transform_write(str(src / "*.parquet"), str(out), fn)
    assert r1 == {"shards": 3, "skipped": 0, "rows": 6}
    assert len(os.listdir(logdir)) == 3
    got = read_partitioned(str(out)).to_pandas()
    assert sorted(got["doc_id"]) == [0, 1, 10, 11, 20, 21]
    assert set(got["text"]) == {"A", "B"}

    # simulate a crash on f1's shard: marker gone, stale partial data left
    os.remove(str(out / f"shard={shard_key(str(src / 'f1.parquet'))}"
                  / "_SUCCESS"))
    for f in os.listdir(logdir):
        os.remove(os.path.join(logdir, f))
    assert len(read_partitioned(str(out)).to_pandas()) == 4  # reader hides it

    r2 = resumable_transform_write(str(src / "*.parquet"), str(out), fn)
    assert r2 == {"shards": 3, "skipped": 2, "rows": 2}
    assert os.listdir(logdir) == ["ran_10"]  # ONLY shard 1 re-ran
    assert len(read_partitioned(str(out)).to_pandas()) == 6


def _langid_scalar_reference(texts):
    """The original per-row LangId loop, kept as the differential twin."""
    import re

    from raycrawl.pipelines.textops import _STOPWORDS

    tok = re.compile(r"[a-zA-ZÀ-ɏ]+")
    tables = {k: v for k, v in _STOPWORDS.items() if v}
    preds = []
    for text in texts:
        words = set(tok.findall((text or "").lower()))
        best, best_n = "en", 0
        for lang in sorted(tables):
            n = len(words & tables[lang])
            if n > best_n:
                best, best_n = lang, n
        preds.append(best)
    return preds


_LANG_ALPHABET = "the und la el les einst ÀàÉéǏ .,;!19-\n\tDIE EsT un"


@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet=_LANG_ALPHABET, max_size=60)),
        min_size=0,
        max_size=24,
    )
)
@settings(max_examples=150, deadline=None)
def test_langid_batch_matches_scalar_reference(texts):
    from raycrawl.pipelines.textops import LangId

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = LangId()(t)["lang_pred"].to_pylist()
    assert got == _langid_scalar_reference(texts)


def test_langid_tie_and_default_cases():
    from raycrawl.pipelines.textops import LangId

    texts = [
        "",                       # no evidence -> en
        "xyzzy 123",              # no stopwords -> en
        "und der le la",          # 2-2 tie de/fr -> de (sorted first)
        "el los es y un",         # es majority (un is also fr)
        "the the the of and",     # distinct counting: 'the' counts once
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}
    )
    got = LangId()(t)["lang_pred"].to_pylist()
    assert got == _langid_scalar_reference(texts)
    assert got[2] == "de" and got[4] == "en"


def test_coarse_parts_sizing(tmp_path, monkeypatch):
    """The dedup-family coarse width grows with the corpus (bounded
    per-partition frames at 100 TB), floors at the test-box 64, and obeys
    the env pin."""
    from raycrawl.pipelines import dedup

    monkeypatch.delenv("RAYCRAWL_CPARTS", raising=False)
    assert dedup.coarse_parts(str(tmp_path)) == 64  # no corpus -> floor

    doc = tmp_path / "documents.parquet"
    with open(doc, "wb") as f:
        f.truncate(16 << 30)  # sparse 16 GiB corpus -> 512 blocks
    assert dedup.coarse_parts(str(tmp_path)) == 256

    monkeypatch.setenv("RAYCRAWL_CPARTS", "128")
    assert dedup.coarse_parts(str(tmp_path)) == 128
    monkeypatch.setenv("RAYCRAWL_CPARTS", "100")
    with pytest.raises(ValueError, match="power of two"):
        dedup.coarse_parts(str(tmp_path))


def test_dedup_outputs_invariant_to_coarse_width(ray_session, monkeypatch):
    """The coarse mask only PLACES rows (same key always colocates), so
    every dedup output must be identical at any partition width."""
    from raycrawl.pipelines.dedup import exact_dedup, minhash_lsh_pairs

    def pairs_set(df):
        return {tuple(r) for r in df[["id_a", "id_b"]].itertuples(index=False)}

    monkeypatch.delenv("RAYCRAWL_CPARTS", raising=False)
    exact_ref = exact_dedup(SF).to_pandas().sort_values("keep_id")
    mh_ref = pairs_set(minhash_lsh_pairs(SF).to_pandas())

    monkeypatch.setenv("RAYCRAWL_CPARTS", "4")
    exact_4 = exact_dedup(SF).to_pandas().sort_values("keep_id")
    assert exact_4["keep_id"].tolist() == exact_ref["keep_id"].tolist()
    assert exact_4["n_dups"].tolist() == exact_ref["n_dups"].tolist()
    assert pairs_set(minhash_lsh_pairs(SF).to_pandas()) == mh_ref


def test_resumable_sink_grown_input_keeps_committed_shards(
        ray_session, tmp_path):
    """Shard keys are a stable function of the input path, so growing the
    input set (even with a file that sorts before committed ones) leaves
    committed shards untouched and runs ONLY the new fragment — the old
    positional keying re-ran every shifted fragment and a crash mid-re-run
    could commit one fragment under two indices (duplicate rows)."""
    from raycrawl.pipelines.sink import (
        read_partitioned,
        resumable_transform_write,
        shard_key,
    )

    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    for name, ids in (("b.parquet", [10, 11]), ("c.parquet", [20, 21])):
        pq.write_table(pa.table({"doc_id": ids}), str(src / name))
    r1 = resumable_transform_write(str(src / "*.parquet"), str(out))
    assert r1 == {"shards": 2, "skipped": 0, "rows": 4}

    # grow the input with a file that sorts first: b/c keys are unchanged
    pq.write_table(pa.table({"doc_id": [0, 1]}), str(src / "a.parquet"))
    r2 = resumable_transform_write(str(src / "*.parquet"), str(out))
    assert r2 == {"shards": 3, "skipped": 2, "rows": 2}
    got = read_partitioned(str(out)).to_pandas()
    assert sorted(got["doc_id"]) == [0, 1, 10, 11, 20, 21]

    # a marker whose recorded source does not match its key's path is
    # treated as uncommitted (hand-moved shard directory)
    key_a = shard_key(str(src / "a.parquet"))
    marker = out / f"shard={key_a}" / "_SUCCESS"
    marker.write_text("somewhere/else.parquet")
    r3 = resumable_transform_write(str(src / "*.parquet"), str(out))
    assert r3 == {"shards": 3, "skipped": 2, "rows": 2}

    # idempotent final run: every marker matches its source
    r4 = resumable_transform_write(str(src / "*.parquet"), str(out))
    assert r4 == {"shards": 3, "skipped": 3, "rows": 0}


def test_embedding_stages_survive_empty_blocks(ray_session):
    """Ray Data can deliver empty blocks; the embedding kernels
    (reshape(-1, d) / np.stack) must emit typed empty partials instead of
    crashing, with results identical to the no-empty-block run."""
    import ray.data as rd

    from raycrawl.pipelines.ann import kmeans_assign, label_centroids
    from raycrawl.pipelines.dedup import embedding_near_dup

    t = pq.read_table(os.path.join(SF, "embeddings.parquet"),
                      columns=["vec_id", "label", "embedding"])
    empty = t.schema.empty_table()
    with_empty = rd.from_arrow([t, empty])

    km = kmeans_assign(SF, ds=with_empty.select_columns(
        ["vec_id", "embedding"])).to_pandas().sort_values("vec_id")
    km_ref = kmeans_assign(SF).to_pandas().sort_values("vec_id")
    assert km["cluster"].tolist() == km_ref["cluster"].tolist()

    lc = label_centroids(SF, ds=with_empty.select_columns(
        ["label", "embedding"])).to_pandas().sort_values(["label", "dim"])
    lc_ref = label_centroids(SF).to_pandas().sort_values(["label", "dim"])
    assert lc["sum_scaled"].tolist() == lc_ref["sum_scaled"].tolist()

    nd = embedding_near_dup(SF, threshold=0.3, blocking="lsh", n_planes=2,
                            ds=with_empty).to_pandas()
    nd_ref = embedding_near_dup(SF, threshold=0.3, blocking="lsh",
                                n_planes=2).to_pandas()
    pairs = {tuple(r) for r in nd[["id_a", "id_b"]].itertuples(index=False)}
    ref = {tuple(r) for r in nd_ref[["id_a", "id_b"]].itertuples(index=False)}
    assert pairs == ref


def test_kmeans_matches_numpy_twin(ray_session):
    """Distributed 2-round integer Lloyd == single-process numpy twin."""
    from raycrawl.pipelines.ann import kmeans_assign

    t = pq.read_table(
        os.path.join(SF, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.floor(
        np.stack(t["embedding"].to_pylist()).astype(np.float64) * 1_000_000
    ).astype(np.int64)
    order = np.argsort(ids)
    ids, x = ids[order], x[order]
    k = 8
    cents = x[ids < k]

    def assign(c_ids, c):
        dist = (
            (x * x).sum(1, keepdims=True)
            - 2 * (x @ c.T)
            + (c * c).sum(1)[None, :]
        )
        return c_ids[np.argmin(dist, axis=1)]

    a1 = assign(np.arange(k), cents)
    uniq = np.unique(a1)
    new = np.stack(
        [
            np.sign(s) * (np.abs(s) // (a1 == u).sum())
            for u, s in ((u, x[a1 == u].sum(0)) for u in uniq)
        ]
    )
    a2 = assign(uniq, new)
    got = kmeans_assign(SF).to_pandas().sort_values("vec_id")
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["cluster"].to_numpy() == a2).all()


def test_multimodal_decode_paths(ray_session, monkeypatch):
    from raycrawl.pipelines.multimodal import ImageDecoder, png_header

    # fake path: deterministic byte-histogram feature (the oracle twin)
    monkeypatch.setenv("RAYCRAWL_FAKE_DECODE", "1")
    dec = ImageDecoder()
    batch = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"abc"], pa.binary()),
            "n_bytes": pa.array([3], pa.int64()),
        }
    )
    out = dec(batch)
    assert out["first_byte"].to_pylist() == [97]
    assert len(out["feature"][0]) == 8
    # real path: header parse feeds (fmt_code, w, h, color, len)
    monkeypatch.setenv("RAYCRAWL_FAKE_DECODE", "0")
    real = ImageDecoder()
    head = png_header(640, 480, color_type=6)
    out = real(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "payload": pa.array([head + b"body"], pa.binary()),
                "n_bytes": pa.array([len(head) + 4], pa.int64()),
            }
        )
    )
    assert out["feature"][0].as_py() == [1, 640, 480, 6, len(head) + 4, 0, 0, 0]


def test_parse_image_dims_roundtrip():
    from raycrawl.pipelines.multimodal import (
        gif_header,
        jpeg_header,
        parse_image_dims,
        png_header,
    )

    for w, h in [(1, 1), (16, 16), (1015, 815), (65535, 65535)]:
        assert parse_image_dims(png_header(w, h, color_type=2) + b"x" * 9) == (
            "png", w, h, 2,
        )
        assert parse_image_dims(jpeg_header(w, h, 3) + b"\xff\xd9") == (
            "jpeg", w, h, 3,
        )
        assert parse_image_dims(gif_header(w, h, packed=0x87)) == (
            "gif", w, h, 0x87,
        )
    # PNG allows 31-bit dims; JPEG/GIF are u16 — PNG only for the big case
    assert parse_image_dims(png_header(2**31 - 1, 3)) == ("png", 2**31 - 1, 3, 2)
    # grayscale JPEG (1 component), palette GIF packed byte
    assert parse_image_dims(jpeg_header(10, 20, 1)) == ("jpeg", 10, 20, 1)


def test_parse_image_dims_never_raises():
    """A 100-TB corpus contains garbage; the kernel classifies, never raises."""
    from raycrawl.pipelines.multimodal import (
        _PNG_SIG,
        jpeg_header,
        parse_image_dims,
        png_header,
    )

    cases = [
        b"",
        None,
        b"\x00" * 64,
        b"not an image at all",
        _PNG_SIG,                      # signature only, no IHDR
        _PNG_SIG + b"\x00\x00\x00\x0dIHDR",  # truncated IHDR
        b"GIF89a\x10",                 # truncated screen descriptor
        b"\xff\xd8",                   # bare SOI
        b"\xff\xd8\xff\xe0\x00\x02",   # APP0 with no payload
        b"\xff\xd8\xff\xe0\x00\x00",   # seglen < 2 (would loop forever if unguarded)
        b"\xff\xd8\x00\x01\x02\x03",   # non-marker byte after SOI
        png_header(5, 5)[:20],         # truncated mid-IHDR
        jpeg_header(5, 5)[:8],         # truncated mid-APP0
    ]
    for b in cases:
        fmt, w, h, c = parse_image_dims(b)
        assert fmt == "unknown" and (w, h, c) == (0, 0, 0), (b, fmt)
    # fill bytes and restart markers before SOF are skipped, not fatal
    padded = b"\xff\xd8" + b"\xff\xff" + b"\xff\x01" + jpeg_header(7, 9, 3)[2:]
    assert parse_image_dims(padded) == ("jpeg", 7, 9, 3)


def test_multimodal_dims_pipeline(ray_session):
    from raycrawl.pipelines.multimodal import multimodal_dims

    got = multimodal_dims(SF).to_pandas().sort_values("doc_id")
    ids = got["doc_id"].to_numpy()
    assert (got["width"].to_numpy() == 16 + (ids * 7) % 1000).all()
    assert (got["height"].to_numpy() == 16 + (ids * 13) % 800).all()
    fmt_by_mod = np.array(["png", "jpeg", "gif"])
    assert (got["fmt"].to_numpy() == fmt_by_mod[ids % 3]).all()


def test_token_stats_values(ray_session):
    from raycrawl.pipelines.textops import token_stats

    got = token_stats(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(os.path.join(SF, "documents.parquet")).to_pandas()
    for _, row in docs.head(10).iterrows():
        assert got.loc[row.doc_id, "n_tokens"] == len(row.text.split())
        assert got.loc[row.doc_id, "text_len"] == len(row.text)


def test_bigrams_topk_planted(ray_session, tmp_path):
    """Brute-force Counter twin over docs with boundary/empty edges."""
    from collections import Counter

    from raycrawl.pipelines.textops import bigrams_topk

    texts = [
        "The quick brown fox",   # case-folding: 'the quick'
        "the quick red fox",     # shares 'the quick'
        "fox",                   # single token: no bigrams
        "",                      # empty doc
        "the quick the quick",   # within-doc repeat
    ]
    import pyarrow as pa

    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    brute = Counter()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        brute.update(" ".join(p) for p in zip(ws, ws[1:]))
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = bigrams_topk(str(tmp_path)).to_pandas()
    assert list(zip(got["gram"], got["n"])) == want
    assert brute["the quick"] == 4  # the planted cross-doc + repeat signal


def test_heavy_tokens_planted_and_bruteforce(ray_session, tmp_path):
    """Strict > N/k threshold on a planted corpus (k=3 forces the MG
    candidate compression: 6 distinct > k), then a pandas twin at SF."""
    from collections import Counter

    from raycrawl.pipelines.textops import heavy_tokens

    import pyarrow as pa

    text = " ".join(["a"] * 10 + ["b"] * 5 + ["c"] * 2 + ["d", "e", "f"])
    pq.write_table(
        pa.table({"doc_id": [0], "text": [text]}),
        str(tmp_path / "documents.parquet"),
    )
    out = heavy_tokens(str(tmp_path), k=3).to_pandas()
    # N=20, N/k=6.67: only 'a' (10) qualifies; 'b' (5*3=15 <= 20) must not
    assert list(zip(out["token"], out["n"])) == [("a", 10)]

    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["text"]
    ).to_pandas()
    cnt = Counter(w for t in docs["text"] for w in t.lower().split() if w)
    total = sum(cnt.values())
    want = {t: n for t, n in cnt.items() if n * 200 > total}
    got = heavy_tokens(SF, k=200).to_pandas()
    assert dict(zip(got["token"], got["n"])) == want


@given(
    st.lists(
        st.text(alphabet="abcd \n", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_bigrams_topk_fuzz(ray_session, texts):
    """Bigram top-k == brute-force Counter under every corpus shape."""
    from collections import Counter

    from raycrawl.pipelines.textops import bigrams_topk

    import pyarrow as pa
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": list(range(len(texts))), "text": texts}),
            os.path.join(d, "documents.parquet"),
        )
        got = bigrams_topk(d, k=10).to_pandas()
    brute = Counter()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        brute.update(" ".join(p) for p in zip(ws, ws[1:]))
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["gram"], got["n"])) == want


@given(
    st.lists(
        st.text(alphabet="abcd \n", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=15, deadline=None)
def test_heavy_tokens_fuzz(ray_session, texts, k):
    """MG candidate sweep == brute-force Counter for every corpus shape
    (docs split across the 8-block floor, so the cross-batch candidate
    union is exercised)."""
    from collections import Counter

    from raycrawl.pipelines.textops import heavy_tokens

    import pyarrow as pa
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"doc_id": list(range(len(texts))), "text": texts}),
            os.path.join(d, "documents.parquet"),
        )
        got = heavy_tokens(d, k=k).to_pandas()
    cnt = Counter(w for t in texts for w in t.lower().split() if w)
    total = sum(cnt.values())
    want = {t: n for t, n in cnt.items() if n * k > total}
    assert dict(zip(got["token"], got["n"])) == want


def test_repetition_stats_planted(ray_session, tmp_path):
    """Edge cases + hand-computed n-gram counts (brute-force Counter twin)."""
    from collections import Counter

    from raycrawl.pipelines.textops import repetition_stats

    texts = [
        "a b a b a b",          # bigrams: ab x3, ba x2 -> top 3, dup 3
        "x",                    # single token: no n-grams
        "",                     # empty doc
        "  spaced   out  ",     # whitespace edges
        "t t t t",              # tt x3
        "one two three four",   # all distinct
    ]
    import pyarrow as pa

    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        repetition_stats(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, text in enumerate(texts):
        ts = [w for w in text.lower().split() if w]
        bg = Counter(zip(ts, ts[1:]))
        tg = Counter(zip(ts, ts[1:], ts[2:]))
        row = got.loc[i]
        assert row.n_bigrams == sum(bg.values()), (i, text)
        assert row.n_dup_bigrams == sum(bg.values()) - len(bg), (i, text)
        assert row.top_bigram_n == (max(bg.values()) if bg else 0), (i, text)
        assert row.n_trigrams == sum(tg.values()), (i, text)
        assert row.top_trigram_n == (max(tg.values()) if tg else 0), (i, text)


@given(
    st.lists(
        st.text(alphabet="ab \n\t", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=30, deadline=None)
def test_repetition_stats_fuzz(texts):
    """Hypothesis: the vectorized batch kernel == a row-wise Counter."""
    from collections import Counter

    import pyarrow as pa

    from raycrawl.pipelines import textops

    # driving the full Dataset op per hypothesis example is too heavy;
    # call the map_batches UDF directly on an in-memory table instead
    t = pa.table(
        {"doc_id": list(range(len(texts))), "text": [x.lower() for x in texts]}
    )
    got = textops._repetition_batch(t).to_pandas().set_index("doc_id")
    for i, text in enumerate(texts):
        ts = [w for w in text.lower().split() if w]
        bg = Counter(zip(ts, ts[1:]))
        tg = Counter(zip(ts, ts[1:], ts[2:]))
        row = got.loc[i]
        assert row.n_bigrams == sum(bg.values())
        assert row.n_dup_bigrams == sum(bg.values()) - len(bg)
        assert row.top_bigram_n == (max(bg.values()) if bg else 0)
        assert row.n_trigrams == sum(tg.values())
        assert row.top_trigram_n == (max(tg.values()) if tg else 0)


@given(
    st.lists(
        st.text(alphabet="abc \n", min_size=0, max_size=25),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=40, deadline=None)
def test_shingles_fuzz(texts, n):
    """The vectorized cross-row shingle builder == per-row brute force
    (window masking at row boundaries is the part worth fuzzing — it is
    shared by repetition, decontaminate, and curation)."""
    from raycrawl.pipelines.textops import _flat_tokens, _shingles

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    g, grow = _shingles(*_flat_tokens(t), n)
    got = sorted(zip(grow.tolist(), g.tolist()))
    exp = []
    for i, text in enumerate(texts):
        ts = [w for w in text.lower().split() if w]
        exp += [(i, " ".join(ts[j : j + n])) for j in range(len(ts) - n + 1)]
    assert got == sorted(exp)


def test_decontaminate_planted(ray_session, tmp_path):
    """Eval doc (id%97==0) shingles poison exactly the docs sharing a
    full n-gram; bigram-only overlap does not count; eval rows excluded."""
    from raycrawl.pipelines.textops import decontaminate

    rows = [
        (0, "alpha beta gamma delta"),            # eval doc (0 % 97 == 0)
        (1, "stuff alpha beta gamma more"),       # shares trigram -> 1
        (2, "totally unrelated words here"),      # clean
        (3, "alpha beta different tail"),         # bigram only -> clean
        (4, "x y"),                               # too short for a trigram
        (97, "alpha beta gamma delta"),           # eval doc, excluded
        (98, "delta gamma beta alpha"),           # reversed: no shared gram
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        decontaminate(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["contaminated"]
        .sort_index()
    )
    assert sorted(got.index) == [1, 2, 3, 4, 98]  # 0 and 97 excluded
    assert got.to_dict() == {1: 1, 2: 0, 3: 0, 4: 0, 98: 0}


def test_hash_split_deterministic(ray_session, tmp_path):
    """Split matches the closed-form hash row-by-row, covers every doc,
    and lands near the requested 80/10/10 fractions."""
    from raycrawl.pipelines.textops import (
        _SPLIT_ADD,
        _SPLIT_MUL,
        hash_split,
    )

    ids = list(range(2000))
    pq.write_table(
        pa.table({"doc_id": ids, "text": ["w" for _ in ids]}),
        str(tmp_path / "documents.parquet"),
    )
    got = hash_split(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert len(got) == len(ids)
    h = (np.array(ids, np.uint64) * np.uint64(_SPLIT_MUL)) + np.uint64(
        _SPLIT_ADD
    )
    bucket = (h >> np.uint64(52)).astype(np.int64)
    assert (got["bucket"].to_numpy() == bucket).all()
    exp = np.where(
        bucket < 4096 * 80 // 100,
        "train",
        np.where(bucket < 4096 * 90 // 100, "val", "test"),
    )
    assert (got["split"].to_numpy() == exp).all()
    frac = got["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15


def test_stratified_sample_deterministic(ray_session, tmp_path):
    """Row-by-row closed-form twin; rates land near target; independent
    of the hash_split assignment; unknown langs dropped."""
    from raycrawl.pipelines.textops import (
        _SAMPLE_ADD,
        _SAMPLE_MUL,
        SAMPLE_RATES_4096,
        stratified_sample,
    )

    ids = list(range(4000))
    langs = [("en", "zh", "xx")[i % 3] for i in ids]
    pq.write_table(
        pa.table({"doc_id": ids, "lang": langs, "text": ["w"] * len(ids)}),
        str(tmp_path / "documents.parquet"),
    )
    got = stratified_sample(str(tmp_path)).to_pandas()
    h = np.array(ids, np.uint64) * np.uint64(_SAMPLE_MUL) + np.uint64(
        _SAMPLE_ADD
    )
    bucket = (h >> np.uint64(52)).astype(np.int64)
    lim = np.array(
        [SAMPLE_RATES_4096.get(l, 0) for l in langs], np.int64
    )
    want = set(np.array(ids)[bucket < lim].tolist())
    assert set(got["doc_id"]) == want
    assert not (got["lang"] == "xx").any()
    en = (got["lang"] == "en").sum() / (len(ids) / 3)
    zh = (got["lang"] == "zh").sum() / (len(ids) / 3)
    assert 0.20 < en < 0.30 and 0.70 < zh < 0.80


def test_curation_planted(ray_session, planted_docs):
    """Every flag checked per doc on the planted corpus: doc 0 is the eval
    doc (excluded); its dups are contaminated AND non-survivors; the short
    singletons fail the length gate; keep is the AND of the four gates."""
    from raycrawl.pipelines.textops import curation

    got = (
        curation(planted_docs)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert sorted(got.index) == [1, 2, 3, 4, 5]
    # cluster {0,1,2,5} is canonicalized by eval doc 0 -> 1,2,5 dropped
    assert got["survivor"].to_dict() == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}
    # exact/near dups of the eval doc share trigrams with it
    assert got["uncontaminated"].to_dict() == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}
    assert got["n_tokens"].to_dict() == {1: 60, 2: 60, 3: 8, 4: 7, 5: 60}
    assert got["q_ok"].to_dict() == {1: 1, 2: 1, 3: 0, 4: 0, 5: 1}
    assert (got["rep_ok"] == 1).all()
    assert (
        got["keep"]
        == got["q_ok"]
        * got["rep_ok"]
        * got["uncontaminated"]
        * got["survivor"]
    ).all()


def test_hll_users_accuracy_and_determinism(ray_session, tmp_path):
    """HLL estimate within ~5-sigma of truth at small AND large
    cardinality (linear-counting and raw regimes), and bit-identical
    across runs (deterministic hash, no RNG)."""
    from raycrawl.pipelines.relops import events_hll_users

    for n_users, n_rows in ((150, 3000), (60_000, 120_000)):
        ids = np.arange(n_rows, dtype=np.int64) % n_users + 7_000_000
        pa_t = pa.table({"user_id": ids})
        pq.write_table(pa_t, str(tmp_path / "events.parquet"))
        est1 = events_hll_users(str(tmp_path))["n_users_hll"][0].as_py()
        est2 = events_hll_users(str(tmp_path))["n_users_hll"][0].as_py()
        assert est1 == est2
        assert abs(est1 - n_users) / n_users < 0.04, (n_users, est1)


def test_fingerprint_deterministic(ray_session):
    from raycrawl.pipelines.textops import fingerprint64

    assert fingerprint64("hello") == fingerprint64("hello")
    assert fingerprint64("hello") != fingerprint64("hello ")
    assert 0 <= fingerprint64("x" * 10000) < (1 << 61) - 1


def test_entry_contract(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    tbl = e.entry()
    assert tbl.num_rows > 0
    assert set(tbl.schema.names) == {"url_norm", "depth"}
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


# ---- fast-path differential coverage (repo invariant: every fast path
# ---- stays fuzz-covered) ---------------------------------------------


def test_dim_index_matches_index_in():
    """_DimIndex (built once per actor) must agree with pc.index_in on
    dense, sparse, singleton, and empty dims, including missing probes."""
    import pyarrow.compute as pc

    from raycrawl.pipelines.relops import _DimIndex

    rng = np.random.RandomState(7)
    sparse = np.unique(rng.randint(0, 10**9, 600))[:500]
    for keys in [np.arange(1, 1001), sparse, np.array([5])]:
        ka = pa.array(keys, pa.int64())
        di = _DimIndex(ka)
        probe = pa.array(
            rng.choice(
                np.concatenate([keys, rng.randint(0, 10**9, 200)]), 3000
            ),
            pa.int64(),
        )
        want = pc.cast(pc.index_in(probe, value_set=ka), pa.int64())
        assert di.lookup(probe).equals(want)
    empty = _DimIndex(pa.array([], pa.int64()))
    assert empty.lookup(pa.array([1, 2], pa.int64())).null_count == 2


from hypothesis import given, settings
from hypothesis import strategies as st

_auth_tokens = st.sampled_from(
    ["http://", "https://", "HTTP://", "", "h0.example.com", "H0.Example.COM",
     "u@h", ".h", "h.", "h:80", "h:", "/x", "?q", "#f", ";", "%7e", "héllo",
     "a..b", "x"]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_auth_tokens, min_size=1, max_size=4))
def test_authority_keep_mask_fuzz(parts):
    """Vectorized authority filter == scalar authority_of over adversarial
    url shapes (uppercase, userinfo, edge dots, ports, non-ascii)."""
    from raycrawl.functions.canonicalize import authority_of
    from raycrawl.pipelines.crawlqueries import authority_keep_mask

    url = "".join(parts)
    want = "h0.example.com"
    try:
        expect = authority_of(url) == want
    except ValueError:
        return  # >1 '@': both paths raise; filter inputs never hit this
    got = authority_keep_mask(pa.array([url], pa.string()), want).to_pylist()
    assert got == [expect], url


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=400),
    st.sampled_from([0.5, 0.9]),
)
def test_quantile_disc_pick_matches_duckdb(vals, q):
    """The histogram-cumsum quantile pick (orders_price_quantiles.quant)
    must reproduce DuckDB's quantile_disc exactly — same ceil(q*n) float
    expression on both sides, duplicates collapse into histogram rows."""
    import math

    import duckdb
    import numpy as np

    # histogram path, identical to the pipeline's quant()
    uniq, counts = np.unique(np.array(vals, dtype=np.int64), return_counts=True)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    rank = math.ceil(q * n)
    ours = int(uniq[np.searchsorted(cum, rank, side="left")])

    con = duckdb.connect()
    theirs = con.execute(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)", [q, vals]
    ).fetchone()[0]
    assert ours == theirs, (vals, q)


# ---------------------------------------------------------------------------
# round 4: segment dedup, corpus-relative signals
# ---------------------------------------------------------------------------


def _write_docs(dirpath, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(list(texts)),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(dirpath), "documents.parquet"),
    )
    return str(dirpath)


def _ref_segment_dedup(texts, width):
    """Pure-python first-wins segment dedup (the global-order semantics)."""
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        kept = []
        for i in range(0, len(toks), width):
            seg = " ".join(toks[i : i + width])
            if seg not in seen:
                seen.add(seg)
                kept.append(seg)
        if kept:
            out[doc_id] = (" ".join(kept), len(kept))
    return out


def test_segment_dedup_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import segment_dedup

    texts = [
        "a b c d e f",    # both segments novel
        "a b c x y z",    # first segment already seen -> only "x y z"
        "a b c d e f",    # every segment seen -> doc disappears
        "q w",            # short doc = one sub-width segment
    ]
    sf = _write_docs(tmp_path, texts)
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"])
        for r in segment_dedup(sf, width=3).take_all()
    }
    assert got == {
        0: ("a b c d e f", 2),
        1: ("x y z", 1),
        3: ("q w", 1),
    }


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8
    )
)
@settings(max_examples=10, deadline=None)
def test_segment_dedup_fuzz(ray_session, tmp_path_factory, texts):
    from raycrawl.pipelines.textops import segment_dedup

    sf = _write_docs(tmp_path_factory.mktemp("segfuzz"), texts)
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"])
        for r in segment_dedup(sf, width=2).take_all()
    }
    assert got == _ref_segment_dedup(texts, 2)


def test_common_token_ratio_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import common_token_ratio

    # total = 8 tokens; with k_hh=2 only tokens with freq*2 >= 8 (i.e. >=4)
    # are "common": 'a' (5 occurrences). 'b','c' are not.
    texts = ["a a a b c", "a a b"]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in common_token_ratio(sf, k_hh=2).take_all()}
    assert rows[0]["n_tokens"] == 5 and rows[0]["n_common"] == 3
    assert rows[0]["common_ratio_4096"] == (3 * 4096) // 5
    assert rows[1]["n_tokens"] == 3 and rows[1]["n_common"] == 2
    assert rows[1]["common_ratio_4096"] == (2 * 4096) // 3


def test_length_pctile_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import length_pctile

    texts = ["x", "x y", "p q", "a b c d e"]  # lengths 1, 2, 2, 5
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in length_pctile(sf).take_all()}
    assert [rows[i]["n_less"] for i in range(4)] == [0, 1, 1, 3]
    assert [rows[i]["pctile_4096"] for i in range(4)] == [
        0,
        4096 // 4,
        4096 // 4,
        (3 * 4096) // 4,
    ]


def _ref_cooccur(texts, window=2):
    from collections import Counter

    c = Counter()
    for text in texts:
        toks = [w for w in text.lower().split() if w]
        for i, a in enumerate(toks):
            for d in range(1, window + 1):
                if i + d < len(toks):
                    b = toks[i + d]
                    c[" ".join(sorted((a, b)))] += 1
    return c


def test_cooccur_topk_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import cooccur_topk

    sf = _write_docs(tmp_path, ["a b a"])
    t = cooccur_topk(sf)
    # window 2 over [a, b, a]: distance-1 pairs (a,b),(b,a) both sort to
    # "a b"; distance-2 pair (a,a)
    assert list(zip(t["pair"].to_pylist(), t["n"].to_pylist())) == [
        ("a b", 2),
        ("a a", 1),
    ]


@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None)
def test_cooccur_topk_fuzz(ray_session, tmp_path_factory, texts):
    from raycrawl.pipelines.textops import cooccur_topk

    sf = _write_docs(tmp_path_factory.mktemp("cofuzz"), texts)
    t = cooccur_topk(sf, k=1000)
    got = dict(zip(t["pair"].to_pylist(), t["n"].to_pylist()))
    assert got == dict(_ref_cooccur(texts))


def test_pmi_topk_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import pmi_topk

    # "x y" repeated: pair counts well over min_count, exact integers
    # reproducible by hand
    texts = ["x y " * 6]  # tokens: x y x y x y x y x y x y  (12 tokens)
    sf = _write_docs(tmp_path, texts)
    t = pmi_topk(sf, min_count=5)
    rows = {
        p: (nxy, nx, ny, s)
        for p, nxy, nx, ny, s in zip(
            t["pair"].to_pylist(), t["n_xy"].to_pylist(),
            t["n_x"].to_pylist(), t["n_y"].to_pylist(),
            t["pmi_scaled"].to_pylist(),
        )
    }
    # distance-1: (x,y) x11, distance-2: (x,x) x5, (y,y) x5; total N=12,
    # n_x = n_y = 6
    assert rows == {
        "x y": (11, 6, 6, 11 * 12 * 1_000_000 // 36),
        "x x": (5, 6, 6, 5 * 12 * 1_000_000 // 36),
        "y y": (5, 6, 6, 5 * 12 * 1_000_000 // 36),
    }


def test_incremental_dedup_planted(ray_session, tmp_path):
    import numpy as np

    from raycrawl.pipelines.dedup import incremental_dedup
    from raycrawl.pipelines.textops import _SPLIT_ADD, _SPLIT_MUL

    def bucket(doc_id):
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
            h = (np.uint64(doc_id) * np.uint64(_SPLIT_MUL)
                 + np.uint64(_SPLIT_ADD))
        return int(h >> np.uint64(52))

    thr = 4096 * 80 // 100
    ids = list(range(64))
    old_ids = [i for i in ids if bucket(i) < thr]
    new_ids = [i for i in ids if bucket(i) >= thr]
    assert old_ids and len(new_ids) >= 3  # the planted layout is meaningful

    # give two of the new docs texts that already exist in the old slice,
    # the rest unique texts
    dup_new = set(new_ids[:2])
    texts = []
    for i in ids:
        if i in dup_new:
            texts.append(f"old text {old_ids[0]}")
        elif i in set(old_ids):
            texts.append(f"old text {i}")
        else:
            texts.append(f"new text {i}")
    sf = _write_docs(tmp_path, texts)
    got = sorted(
        r["doc_id"] for r in incremental_dedup(sf).take_all()
    )
    assert got == sorted(set(new_ids) - dup_new)


def test_crawl_hits_matches_numpy_reference(ray_session):
    """Differential: the distributed integer HITS vs a dense numpy
    replay of the same fixed-point arithmetic on the same edge set."""
    import numpy as np

    from raycrawl.pipelines.crawlqueries import _link_edges, crawl_hits

    edges_ds, nodes_ds, _ = _link_edges(SF)
    edges = edges_ds.to_pandas()
    nodes = sorted(nodes_ds.to_pandas()["url"])
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()

    scale = 10**6
    auth = np.full(n, scale, np.int64)
    hub = np.zeros(n, np.int64)
    for _ in range(2):
        hub = np.zeros(n, np.int64)
        np.add.at(hub, src, auth[dst])
        if hub.max():
            hub = hub * scale // hub.max()
        auth = np.zeros(n, np.int64)
        np.add.at(auth, dst, hub[src])
        if auth.max():
            auth = auth * scale // auth.max()

    order = sorted(range(n), key=lambda i: (-auth[i], nodes[i]))[:20]
    want = [(nodes[i], int(auth[i]), int(hub[i])) for i in order]
    got = [
        (r["url"], r["auth_scaled"], r["hub_scaled"])
        for r in crawl_hits(SF).take_all()
    ]
    assert got == want


def test_containment_pairs_planted(ray_session, tmp_path):
    """A short doc fully embedded in a long one: containment ~1 while
    Jaccard is far below any dedup threshold."""
    from raycrawl.pipelines.dedup import containment_pairs, jaccard, shingles

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(200))
    long_doc = filler + " " + short + " trailing words here"
    texts = [short, long_doc, "totally unrelated content about arrows"]
    sf = _write_docs(tmp_path, texts)
    sa, sb = shingles(short, 3), shingles(long_doc, 3)
    assert jaccard(sa, sb) < 0.5          # jaccard dedup would miss it
    assert len(sa & sb) / min(len(sa), len(sb)) >= 0.9
    got = {(r["id_a"], r["id_b"]) for r in containment_pairs(sf).take_all()}
    assert got == {(0, 1)}


def test_merge_upsert_planted(ray_session, tmp_path):
    from raycrawl.pipelines.analytics import orders_merge_upsert

    keys = list(range(1, 16))  # 7,14 update; 13 delete; 11 insert
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_totalprice": pa.array([k * 10.0 for k in keys]),
            }
        ),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    out = orders_merge_upsert(str(tmp_path)).to_pandas()
    got = {
        r.o_orderkey: (r.price_cents, r.status) for r in out.itertuples()
    }
    assert 13 not in got                              # deleted
    assert got[7] == (7 * 1000 + 100_000, "updated")
    assert got[14] == (14 * 1000 + 100_000, "updated")
    assert got[11] == (11 * 1000, "base")             # insert copies, base stays
    assert got[11 + 1_000_000_000] == (11 * 1000, "inserted")
    assert got[1] == (1000, "base")
    assert len(got) == len(keys) - 1 + 1              # -delete +insert


def test_bpe_train_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import bpe_train

    # words {aa: 2, ab: 1}; pair (a,a) count 2 wins round 1; after the
    # merge only (a,b) count 1 remains, below the min-count floor -> stop
    sf = _write_docs(tmp_path, ["aa aa ab"])
    t = bpe_train(sf, n_merges=5)
    assert list(zip(t["left"].to_pylist(), t["right"].to_pylist(),
                    t["n"].to_pylist())) == [("a", "a", 2)]


def test_bpe_train_greedy_overlap(ray_session, tmp_path):
    from raycrawl.pipelines.textops import bpe_train

    # "aaaa" x3: pair (a,a) counts 3 per word x 3 words = 9; greedy
    # left-to-right merges two non-overlapping (a,a) per word; next round
    # (aa,aa) count 3
    sf = _write_docs(tmp_path, ["aaaa aaaa aaaa"])
    t = bpe_train(sf, n_merges=2)
    got = list(zip(t["left"].to_pylist(), t["right"].to_pylist(),
                   t["n"].to_pylist()))
    assert got == [("a", "a", 9), ("aa", "aa", 3)]


@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=25),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=8, deadline=None)
def test_bpe_train_fuzz_matches_reference(ray_session, tmp_path_factory, texts):
    """bpe_train(check=True) raises if the distributed trainer diverges
    from the single-node reference — driving it IS the assertion."""
    from raycrawl.pipelines.textops import bpe_train

    sf = _write_docs(tmp_path_factory.mktemp("bpefuzz"), texts)
    bpe_train(sf, n_merges=4)


def test_feature_hash_planted(ray_session, tmp_path):
    import hashlib

    from raycrawl.pipelines.textops import feature_hash

    texts = ["Apple apple banana", "banana banana"]
    sf = _write_docs(tmp_path, texts)
    out = feature_hash(sf).to_pandas()
    got = {
        (r.doc_id, r.dim): r.tf for r in out.itertuples(index=False)
    }

    def dim(w):
        return int(hashlib.md5(w.encode()).hexdigest()[-2:], 16) % 64

    want = {}
    for doc_id, t in enumerate(texts):
        for w in t.lower().split():
            k = (doc_id, dim(w))
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_checked_sketch_queries(ray_session):
    """The two new assertion-checked approximates: the quantile sketch's
    rank-error bound and the bloom decontaminator's zero-false-negative /
    FP-bound checks run INSIDE the query wrappers — invoking them at
    sf0.001 is the test."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    q = m.queries()
    t = q["events_quantile_sketch"]("/root/testdata/sf0.001")
    assert t.column_names == ["q_pct", "approx_cents"]
    assert t["q_pct"].to_pylist() == [10, 50, 90, 99]
    # medians must be non-decreasing across quantiles
    v = t["approx_cents"].to_pylist()
    assert v == sorted(v)

    t2 = q["docs_decontaminate_bloom"]("/root/testdata/sf0.001")
    assert t2.num_rows > 0


def test_scrub_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import SCRUB_TOKEN, scrub

    texts = [
        "spark and scan walk in",      # two hits
        "sparkly scanner merged",      # \b guards: no whole-word hits
        "clean text only",             # untouched
        "merge merge merge",           # repeated hits
    ]
    sf = _write_docs(tmp_path, texts)
    got = {
        r["doc_id"]: (r["n_hits"], r["keep"], r["scrubbed"])
        for r in scrub(sf).take_all()
    }
    R = SCRUB_TOKEN
    assert got == {
        0: (2, 0, f"{R} and {R} walk in"),
        1: (0, 1, "sparkly scanner merged"),
        2: (0, 1, "clean text only"),
        3: (3, 0, f"{R} {R} {R}"),
    }


def test_pack_manifest_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import pack_manifest

    # seq_len=4: doc0 has 3 tokens [0,3) -> seq 0; doc1 has 5 [3,8) ->
    # seqs 0-1; doc2 is EMPTY at offset 8 -> degenerate span seq 2;
    # doc3 has 6 [8,14) -> seqs 2-3
    texts = ["a b c", "d e f g h", "", "i j k l m n"]
    sf = _write_docs(tmp_path, texts)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["first_seq"], r["last_seq"]
        )
        for r in pack_manifest(sf, seq_len=4).take_all()
    }
    assert got == {
        0: (3, 0, 0, 0),
        1: (5, 3, 0, 1),
        2: (0, 8, 2, 2),
        3: (6, 8, 2, 3),
    }


def test_pack_manifest_fuzz(ray_session, tmp_path_factory):
    """Offsets are the exclusive prefix sum in doc_id order regardless of
    how docs land in blocks/partitions."""
    import random

    from raycrawl.pipelines.textops import pack_manifest

    rng = random.Random(7)
    texts = [" ".join("w" for _ in range(rng.randrange(9))) for _ in range(60)]
    sf = _write_docs(tmp_path_factory.mktemp("packfuzz"), texts)
    rows = sorted(
        pack_manifest(sf, seq_len=5).take_all(), key=lambda r: r["doc_id"]
    )
    off = 0
    assert len(rows) == len(texts)
    for r, t in zip(rows, texts):
        n = len(t.split())
        assert (r["n_tokens"], r["start_offset"]) == (n, off)
        assert r["first_seq"] == off // 5
        assert r["last_seq"] == (off + max(n, 1) - 1) // 5
        off += n


def test_oov_rate_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import oov_rate

    # top-2 vocab by (count desc, token asc): 'aa' (4), 'bb' (3);
    # 'cc' (3) loses the tie to 'bb'
    texts = ["aa bb cc", "aa bb cc", "aa bb cc", "aa dd"]
    sf = _write_docs(tmp_path, texts)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ratio_4096"])
        for r in oov_rate(sf, v=2).take_all()
    }
    assert got == {
        0: (3, 1, 4096 // 3),
        1: (3, 1, 4096 // 3),
        2: (3, 1, 4096 // 3),
        3: (2, 1, 2048),
    }


def test_dsir_weights_planted(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as pq

    from raycrawl.pipelines.textops import dsir_weights

    texts = ["aa bb aa", "bb cc", "aa aa", "dd"]
    langs = ["en", "en", "fr", "fr"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(["s"] * 4),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )

    def dim(w):
        return int(hashlib.md5(w.encode()).hexdigest()[-2:], 16) % 64

    n_all, n_tgt = {}, {}
    for t, l in zip(texts, langs):
        for w in t.split():
            d = dim(w)
            n_all[d] = n_all.get(d, 0) + 1
            if l == "en":
                n_tgt[d] = n_tgt.get(d, 0) + 1
    ta, tt = sum(n_all.values()), max(sum(n_tgt.values()), 1)
    ratio = {d: (n_tgt.get(d, 0) * ta * 4096) // (n_all[d] * tt)
             for d in n_all}
    want = {
        i: (len(t.split()), sum(ratio[dim(w)] for w in t.split()))
        for i, t in enumerate(texts)
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_weight"])
        for r in dsir_weights(str(tmp_path)).take_all()
    }
    assert got == want
    # target-language docs of target-common tokens outweigh off-target
    assert got[0][1] > got[3][1]


def test_fluency_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import fluency

    # bigram corpus counts: "a b": 2, "b a": 1, "b c": 1
    texts = ["a b a", "a b c", "x"]
    sf = _write_docs(tmp_path, texts)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_freq"], r["fluency_avg"])
        for r in fluency(sf).take_all()
    }
    # doc0 grams: "a b"(2) + "b a"(1) = 3; doc1: "a b"(2) + "b c"(1) = 3;
    # doc2 has < 2 tokens -> absent
    assert got == {0: (2, 3, 1), 1: (2, 3, 1)}


def test_shuffle_shards_permutation(ray_session, tmp_path):
    from raycrawl.pipelines.textops import (_SHARD_ADD, _SHARD_MUL,
                                            shuffle_shards)

    n = 300
    sf = _write_docs(tmp_path, ["w"] * n)
    rows = shuffle_shards(sf).take_all()
    assert sorted(r["doc_id"] for r in rows) == list(range(n))

    # pure-python reference permutation
    want = {}
    byshard = {}
    for i in range(n):
        h = (i * _SHARD_MUL + _SHARD_ADD) % (1 << 64)
        byshard.setdefault(h >> 58, []).append((h & ((1 << 52) - 1), i))
    for s, members in byshard.items():
        for pos, (_, i) in enumerate(sorted(members)):
            want[i] = (s, pos)
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    assert got == want

    with pytest.raises(ValueError):
        shuffle_shards(sf, n_shards=48)


def test_boilerplate_strip_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from raycrawl.pipelines.textops import boilerplate_strip

    # width=3: "nav bar x" is shared by docs 0 and 1 (same source) ->
    # boiler; doc 2's identical segment is in ANOTHER source -> kept;
    # doc 3 is all boilerplate -> empty text_clean
    texts = [
        "nav bar x unique one two",
        "nav bar x other words here",
        "nav bar x different source",
        "nav bar x",
    ]
    srcs = ["s0", "s0", "s1", "s0"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(srcs),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_boiler"], r["text_clean"])
        for r in boilerplate_strip(str(tmp_path), width=3).take_all()
    }
    assert got == {
        0: (2, 1, "unique one two"),
        1: (2, 1, "other words here"),
        2: (2, 0, "nav bar x different source"),
        3: (1, 1, ""),
    }


def test_prepare_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import (_SHARD_ADD, _SHARD_MUL,
                                            _SPLIT_ADD, _SPLIT_MUL, prepare)

    texts = [
        "clean words here and more tokens",   # survivor
        "spark inside this document here yes",  # blocklist hit -> dropped
        "clean words here and more tokens",   # exact dup of 0 -> dropped
        "too short",                           # < 5 tokens -> dropped
        "another fine document with enough tokens",  # survivor
    ]
    sf = _write_docs(tmp_path, texts)
    rows = prepare(sf, min_tokens=5).take_all()
    got = {r["doc_id"]: (r["split"], r["shard"], r["pos"]) for r in rows}
    assert set(got) == {0, 4}

    # pure-python reference for the surviving ids
    def ref(ids):
        out = {}
        train = []
        for i in ids:
            b = ((i * _SPLIT_MUL + _SPLIT_ADD) % (1 << 64)) >> 52
            split = "train" if b < 3276 else ("val" if b < 3686 else "test")
            h = (i * _SHARD_MUL + _SHARD_ADD) % (1 << 64)
            if split == "train":
                train.append((h >> 58, h & ((1 << 52) - 1), i))
                out[i] = [split, h >> 58, None]
            else:
                out[i] = [split, -1, -1]
        byshard = {}
        for s, pk, i in train:
            byshard.setdefault(s, []).append((pk, i))
        for s, members in byshard.items():
            for pos, (_, i) in enumerate(sorted(members)):
                out[i][2] = pos
        return {i: tuple(v) for i, v in out.items()}

    assert got == ref([0, 4])


def test_watermark_late_planted(ray_session, tmp_path):
    """Planted stream: pure-python replay of the hash-permuted arrival
    order + exclusive running max must match the distributed two-pass
    prefix-scan exactly, including the -1 first-arrival sentinel."""
    from raycrawl.pipelines.analytics import (_ARRIVAL_ADD, _ARRIVAL_MUL,
                                              events_watermark_late)

    n = 257  # crosses several arrival-range partitions
    rng = np.random.RandomState(7)
    ts = rng.randint(0, 10**9, n).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    lateness_s = 100
    rows = events_watermark_late(str(tmp_path), lateness_s=lateness_s)
    got = {
        r["event_id"]: (r["ts_us"], r["wm_us"], r["late"])
        for r in rows.take_all()
    }

    order = sorted(
        range(n),
        key=lambda i: ((i * _ARRIVAL_MUL + _ARRIVAL_ADD) % (1 << 64), i),
    )
    want, wm = {}, -1
    for i in order:
        t = int(ts[i].astype("int64"))
        want[i] = (t, wm, int(wm != -1 and t < wm - lateness_s * 10**6))
        wm = max(wm, t)
    assert got == want
    assert sum(v[2] for v in want.values()) > 0  # non-vacuous: some late


def test_compact_shards_roundtrip_and_resume(ray_session, tmp_path):
    """Compaction preserves every row, shrinks the file count, skips
    committed buckets on re-run, and redoes exactly one bucket after its
    marker is removed (crash simulation)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl.pipelines.sink import compact_shards, read_partitioned

    src = tmp_path / "small"
    src.mkdir()
    total = 0
    for i in range(12):
        n = 10 + i
        pq.write_table(
            pa.table({"x": pa.array(range(total, total + n), pa.int64())}),
            str(src / f"frag-{i:02d}.parquet"),
        )
        total += n
    out = str(tmp_path / "compacted")
    r1 = compact_shards(str(src / "*.parquet"), out, target_rows=50)
    assert r1["rows"] == total and r1["skipped"] == 0
    got = read_partitioned(out).to_pandas()["x"].sort_values().tolist()
    assert got == list(range(total))
    n_shards = len(_glob.glob(out + "/shard=*"))
    assert 1 < n_shards < 12  # actually compacted

    r2 = compact_shards(str(src / "*.parquet"), out, target_rows=50)
    assert r2["skipped"] == n_shards and r2["rows"] == 0

    # crash simulation: drop one marker -> exactly that bucket redone
    victim = sorted(_glob.glob(out + "/shard=*/_SUCCESS"))[0]
    import os as _os

    _os.remove(victim)
    r3 = compact_shards(str(src / "*.parquet"), out, target_rows=50)
    assert r3["skipped"] == n_shards - 1 and r3["rows"] > 0
    got = read_partitioned(out).to_pandas()["x"].sort_values().tolist()
    assert got == list(range(total))
