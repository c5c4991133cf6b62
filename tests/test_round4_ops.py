"""Planted-truth tests for the round-4 additions: PII redaction, source
mix upsampling, the TPC-H Q21/Q22 shapes, and the count-min sketch (the
oracle comparisons live in test_oracles_smoke; these pin the semantic
edges: sole-R qualification, rep factors, the CMS guarantees)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write(d, name, table):
    pq.write_table(table, os.path.join(d, f"{name}.parquet"))


@pytest.fixture(scope="module")
def planted_q21(tmp_path_factory):
    """lineitem with every Q21-shape qualification edge planted."""
    d = str(tmp_path_factory.mktemp("planted_q21"))
    rows = [
        # order 1: supp 1 returns, supp 2 doesn't -> supp 1 qualifies
        (1, 1, "R"), (1, 2, "N"),
        # order 2: BOTH suppliers return -> nobody qualifies (n_r = 2)
        (2, 1, "R"), (2, 2, "R"),
        # order 3: single-supplier order with a return -> excluded (n_supp=1)
        (3, 3, "R"),
        # order 4: multi-supplier, no returns -> nobody qualifies
        (4, 4, "N"), (4, 5, "N"),
        # order 5: supp 2 returns on one of its two lines (max over lines),
        # supp 4 clean -> supp 2 qualifies
        (5, 2, "N"), (5, 2, "R"), (5, 4, "A"),
    ]
    _write(d, "lineitem", pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_returnflag": pa.array([r[2] for r in rows]),
        }
    ))
    return d


def test_suppliers_sole_returns_planted(ray_session, planted_q21):
    from raycrawl.pipelines.analytics import suppliers_sole_returns

    t = suppliers_sole_returns(planted_q21).take_all()
    got = {(r["l_suppkey"], r["n_orders"]) for r in t}
    assert got == {(1, 1), (2, 1)}


@pytest.fixture(scope="module")
def planted_q22(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_q22"))
    # positive balances: 100.00, 300.00 -> avg 200.00; 250.00 is above it
    _write(d, "customer", pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "c_nationkey": pa.array([10, 10, 20, 20, 20], pa.int64()),
            # 1: below avg; 2: above but HAS an order; 3: above + inactive;
            # 4: negative (excluded from the avg, below it anyway);
            # 5: above + inactive, same nation as 3
            "c_acctbal": pa.array(
                [100.0, 300.0, 250.0, -50.0, 299.99], pa.float64()
            ),
        }
    ))
    _write(d, "orders", pa.table(
        {
            # cust 2: one URGENT order (-> active); cust 3: only a LOW
            # order, which does NOT count as activity
            "o_custkey": pa.array([2, 2, 3], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "5-LOW"]),
        }
    ))
    return d


def test_customers_above_avg_inactive_planted(ray_session, planted_q22):
    from raycrawl.pipelines.analytics import customers_above_avg_inactive

    # avg positive balance = (10000 + 30000 + 25000 + 29999)/4 = 23749.75c;
    # above it AND orderless: cust 3 (25000c) and 5 (29999c), both nation 20
    t = customers_above_avg_inactive(planted_q22).take_all()
    got = {(r["c_nationkey"], r["n_cust"], r["total_bal_cents"]) for r in t}
    assert got == {(20, 2, 25000 + 29999)}


@pytest.fixture(scope="module")
def planted_mix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_mix"))
    srcs = ["a"] * 4 + ["b"] * 2 + ["c"]
    _write(d, "documents", pa.table(
        {
            "doc_id": pa.array(list(range(len(srcs))), pa.int64()),
            "text": pa.array(["w"] * len(srcs)),
            "source": pa.array(srcs),
        }
    ))
    return d


def test_mix_upsample_planted(ray_session, planted_mix):
    from raycrawl.pipelines.textops import mix_upsample

    t = mix_upsample(planted_mix).take_all()
    # reps: a -> 4//4=1, b -> 4//2=2, c -> 4//1=4
    by_doc = {}
    for r in t:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert {d: len(v) for d, v in by_doc.items()} == {
        0: 1, 1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 4,
    }
    for d, rows in by_doc.items():
        assert sorted(r["copy"] for r in rows) == list(range(len(rows)))
        assert all(r["rep"] == len(rows) for r in rows)


def test_pii_scrub_redacts_planted(ray_session, tmp_path):
    from raycrawl.pipelines.textops import pii_scrub

    d = str(tmp_path)
    # doc 105 hits all three augments (105 = 3*5*7); doc 1 hits none
    _write(d, "documents", pa.table(
        {
            "doc_id": pa.array([105, 1], pa.int64()),
            "text": pa.array(["hello world", "plain text"]),
        }
    ))
    rows = {r["doc_id"]: r for r in pii_scrub(d).take_all()}
    r = rows[105]
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 1)
    assert r["redacted"] == (
        "hello world contact [EMAIL] call [PHONE] from [IP]"
    )
    r1 = rows[1]
    assert (r1["n_emails"], r1["n_phones"], r1["n_ips"]) == (0, 0, 0)
    assert r1["redacted"] == "plain text"


def test_cms_counts_bounds(ray_session):
    from raycrawl.pipelines.relops import events_cms_counts

    est = events_cms_counts(SF, k=10)
    t = pq.read_table(os.path.join(SF, "events.parquet"),
                      columns=["user_id"])
    exact = {d["values"]: d["counts"]
             for d in pc.value_counts(t["user_id"]).to_pylist()}
    n, width = t.num_rows, 2048
    assert est.num_rows == 10
    for uid, got in zip(est["user_id"].to_pylist(),
                        est["n_events_cms"].to_pylist()):
        true = exact[uid]
        assert got >= true  # the one-sided CMS guarantee
        assert got <= true + 4 * n / width


def test_parse_wav_meta_roundtrip_and_garbage():
    from raycrawl.pipelines.multimodal import parse_wav_meta, wav_header

    body = b"x" * 1001
    b = wav_header(22050, 2, 16, len(body)) + body
    assert parse_wav_meta(b) == (22050, 2, 16, 1001)
    # garbage inputs never raise
    assert parse_wav_meta(b"") == (0, 0, 0, 0)
    assert parse_wav_meta(b"RIFFxxxxWAVE") == (0, 0, 0, 0)  # no fmt chunk
    assert parse_wav_meta(b"\x89PNG\r\n\x1a\n" * 4) == (0, 0, 0, 0)
    assert parse_wav_meta(b[:20]) == (0, 0, 0, 0)  # truncated fmt
    # an extra unknown chunk before fmt must be skipped, odd-length padded
    import struct

    odd = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"
    weird = b[:12] + odd + b[12:]
    patched = b"RIFF" + struct.pack("<I", len(weird) - 8) + weird[8:]
    assert parse_wav_meta(patched) == (22050, 2, 16, 1001)


def test_bpe_encode_matches_reference(ray_session, tmp_path):
    from raycrawl.pipelines.textops import bpe_encode

    d = str(tmp_path)
    texts = [
        "low low low lower lowest",
        "newer newest new new low",
        "",  # zero-token doc must survive with count 0
        "wider wide widest newer",
    ]
    _write(d, "documents", pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    ))
    # check=True raises on any distributed-vs-reference word divergence
    rows = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_encode(d, n_merges=4).take_all()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[2] == 0
    # doc 0 has 5 words; with merges applied every word is <= its char
    # count and >= 1 symbol
    assert 5 <= rows[0] <= sum(len(w) for w in texts[0].split())


@pytest.fixture(scope="module")
def planted_q15(tmp_path_factory):
    """lineitem + supplier where TWO suppliers tie for max revenue."""
    d = str(tmp_path_factory.mktemp("planted_q15"))
    # centi-cents: price_cents * (100 - disc_pct)
    # supp 1: 100.00 @ 0% = 1_000_000; supp 2: 200.00 @ 50% = 1_000_000
    # supp 3: 50.00 @ 0% = 500_000 -> 1 and 2 tie for max
    _write(d, "lineitem", pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_partkey": pa.array([1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 2, 3], pa.int64()),
            "l_extendedprice": pa.array([100.0, 200.0, 50.0]),
            "l_discount": pa.array([0.0, 0.5, 0.0]),
        }
    ))
    _write(d, "supplier", pa.table(
        {
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["s1", "s2", "s3"]),
        }
    ))
    return d


def test_supplier_top_revenue_keeps_ties(ray_session, planted_q15):
    from raycrawl.pipelines.analytics import supplier_top_revenue

    got = {(r["s_suppkey"], r["s_name"], r["revenue_ccents"])
           for r in supplier_top_revenue(planted_q15).take_all()}
    assert got == {(1, "s1", 1_000_000), (2, "s2", 1_000_000)}


def test_promo_revenue_share_planted(ray_session, tmp_path):
    from raycrawl.pipelines.analytics import promo_revenue_share

    d = str(tmp_path)
    _write(d, "part", pa.table(
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_type": pa.array(["PROMO", "STANDARD"]),
        }
    ))
    _write(d, "lineitem", pa.table(
        {
            "l_partkey": pa.array([1, 2, 2], pa.int64()),
            "l_extendedprice": pa.array([10.0, 20.0, 10.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
        }
    ))
    rows = promo_revenue_share(d).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["promo_revenue_ccents"] == 100_000
    assert r["total_revenue_ccents"] == 400_000
    assert r["promo_share_4096"] == 4096 // 4


def test_part_cheapest_supplier_tiebreak(ray_session, tmp_path):
    from raycrawl.pipelines.analytics import part_cheapest_supplier

    d = str(tmp_path)
    # part 1: supp 2 cheaper; part 2: cost tie -> smaller suppkey (3) wins;
    # supp 5's two lines on part 1 SUM above supp 2
    _write(d, "lineitem", pa.table(
        {
            "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([5, 2, 5, 7, 3], pa.int64()),
            "l_extendedprice": pa.array([6.0, 10.0, 6.0, 8.0, 8.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0]),
        }
    ))
    got = {(r["l_partkey"], r["best_suppkey"], r["cost_ccents"])
           for r in part_cheapest_supplier(d).take_all()}
    assert got == {(1, 2, 100_000), (2, 3, 80_000)}


def test_events_mode_type_tiebreak(ray_session, tmp_path):
    from raycrawl.pipelines.analytics import events_mode_type

    d = str(tmp_path)
    ts = pa.array([1_700_000_000_000_000 + i for i in range(7)],
                  pa.timestamp("us"))
    _write(d, "events", pa.table(
        {
            "event_id": pa.array(list(range(7)), pa.int64()),
            "ts": ts,
            # user 1: 2x view, 1x click -> view; user 2: click/view tie
            # -> 'click' (lexicographically first)
            "user_id": pa.array([1, 1, 1, 2, 2, 2, 2], pa.int64()),
            "event_type": pa.array(
                ["view", "view", "click", "click", "view", "view", "click"]
            ),
        }
    ))
    got = {(r["user_id"], r["mode_type"], r["n"])
           for r in events_mode_type(d).take_all()}
    assert got == {(1, "view", 2), (2, "click", 2)}


def test_events_wau_planted(ray_session, tmp_path):
    from raycrawl.pipelines.analytics import events_wau

    d = str(tmp_path)
    us_day = 86_400_000_000
    # user 1 active day 0 and day 10; user 2 active day 0 twice
    ts = pa.array([0, 10 * us_day, 1, 2], pa.timestamp("us"))
    _write(d, "events", pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["view"] * 4),
        }
    ))
    got = {r["day"]: r["wau"] for r in events_wau(d).take_all()}
    # days 0-6 see both users (from day 0); days 10-16 see user 1 only
    expect = {d_: 2 for d_ in range(7)}
    expect.update({d_: 1 for d_ in range(10, 17)})
    assert got == expect


def test_hash_sample_deterministic_bottom_k(ray_session):
    from raycrawl.pipelines.textops import hash_sample, _splitmix64

    rows = hash_sample(SF, k=16).take_all()
    assert len(rows) == 16
    ids = pq.read_table(os.path.join(SF, "documents.parquet"),
                        columns=["doc_id"])["doc_id"].to_numpy()
    h63 = (_splitmix64(ids.astype(np.uint64)) >> np.uint64(1)).astype(
        np.int64
    )
    order = np.lexsort((ids, h63))[:16]
    expect = sorted(
        [(int(ids[i]), int(h63[i])) for i in order],
        key=lambda p: (p[1], p[0]),
    )
    assert [(r["doc_id"], r["h63"]) for r in rows] == expect
    # the sample must not be an id-consecutive run (the affine failure)
    picked = sorted(r["doc_id"] for r in rows)
    assert max(b - a for a, b in zip(picked, picked[1:])) > 1


# ---- SemDeDup / URL blocklist / phrase search / Q19 bands ----


def test_semdedup_planted(ray_session, tmp_path):
    """Two well-separated clusters; inside cluster 0 the two later copies
    of the seed direction are dropped, the dissimilar pair in cluster 1
    both survive. Seeds are vec_id<k so assignment is unambiguous."""
    from raycrawl.pipelines.dedup import semdedup

    vecs = [
        (0, [1.0, 0.0]),    # cluster 0 seed
        (1, [0.0, 1.0]),    # cluster 1 seed
        (2, [0.99, 0.01]),  # ~= v0 -> dropped at threshold .95
        (3, [0.6, 0.8]),    # cluster 1, cos(v1,v3)=0.8 -> kept
        (4, [1.0, 0.001]),  # ~= v0 -> dropped
    ]
    d = str(tmp_path)
    _write(d, "embeddings", pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs],
                                  pa.list_(pa.float32())),
        }
    ))
    t = semdedup(d, k=2, threshold=0.95).to_pandas()
    got = dict(zip(t["vec_id"], t["keep"]))
    assert got == {0: 1, 1: 1, 2: 0, 3: 1, 4: 0}
    clusters = dict(zip(t["vec_id"], t["cluster"]))
    assert clusters[2] == clusters[0] and clusters[4] == clusters[0]
    assert clusters[3] == clusters[1] and clusters[0] != clusters[1]


def test_semdedup_min_id_always_kept(ray_session):
    from raycrawl.pipelines.dedup import semdedup

    t = semdedup(SF).to_pandas()
    firsts = t.loc[t.groupby("cluster")["vec_id"].idxmin()]
    assert (firsts["keep"] == 1).all()
    assert set(t["keep"].unique()) <= {0, 1}


def test_crawl_url_filter_suffix_semantics(ray_session):
    """example.net blocks every *.example.net subdomain (suffix rule);
    unlisted corpus hosts are never domain-blocked; counts are closed."""
    from raycrawl.pipelines.crawlqueries import crawl_url_filter

    t = crawl_url_filter("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0
    for _, r in t.iterrows():
        host = r["dst_host"]
        if host == "example.net" or host.endswith(".example.net"):
            assert r["n_domain_blocked"] == r["n_cands"]
            assert r["n_allowed"] == 0
        elif host != "h2.example.com":
            assert r["n_domain_blocked"] == 0
        assert r["n_allowed"] <= r["n_cands"]
        # every candidate is exactly one of: allowed, or blocked by >=1 rule
        assert (r["n_allowed"] < r["n_cands"]) == (
            r["n_domain_blocked"] + r["n_path_blocked"] > 0
        ) or r["n_allowed"] == r["n_cands"]


def test_phrase_search_planted(ray_session, tmp_path):
    from raycrawl.pipelines.retrieval import docs_phrase_search

    d = str(tmp_path)
    _write(d, "documents", pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "a hash join b hash join",   # two hits, first at pos 1
                "hash x join",               # adjacency required: no hit
                "HASH  JOIN c",              # lowercase + multi-space: pos 0
                "join hash",                 # order matters: no hit
            ]),
        }
    ))
    t = docs_phrase_search(d).to_pandas().set_index("doc_id")
    assert set(t.index) == {1, 3}
    assert t.loc[1, "n_hits"] == 2 and t.loc[1, "first_pos"] == 1
    assert t.loc[3, "n_hits"] == 1 and t.loc[3, "first_pos"] == 0


def test_q19_planted(ray_session, tmp_path):
    """One lineitem inside each band, one failing only the quantity
    coupling, one failing only the size — the disjunction must resolve
    per (part attrs x lineitem attrs) row, never per side."""
    from raycrawl.pipelines.relops import q19_disjunctive_revenue

    d = str(tmp_path)
    _write(d, "part", pa.table(
        {
            "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
            "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#3", "Brand#1"]),
            "p_size": pa.array([10, 20, 30, 40], pa.int32()),
        }
    ))
    # (partkey, qty, price, disc): rows 1-3 hit bands 1-3; row 4's part
    # size 40 fails band 1; row 5 couples Brand#1/size10 with qty 25 (out
    # of band 1's qty range) — both must be excluded
    _write(d, "lineitem", pa.table(
        {
            "l_partkey": pa.array([1, 2, 3, 4, 1], pa.int64()),
            "l_quantity": pa.array([5.0, 15.0, 25.0, 5.0, 25.0]),
            "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
            "l_discount": pa.array([0.0, 0.05, 0.1, 0.0, 0.0]),
        }
    ))
    t = q19_disjunctive_revenue(d).to_pandas()
    assert len(t) == 1
    # 1000*100 + 2000*95 + 3000*90 = 100000 + 190000 + 270000
    assert int(t["revenue_ccents"].iloc[0]) == 560000
    assert int(t["n_items"].iloc[0]) == 3


# ---- profiling / grouped HLL / edit-distance-1 linkage batch ----


def test_table_profile_planted_nulls(ray_session, tmp_path):
    """Null handling the gate corpus can't exercise: nulls counted, never
    a distinct value, min/max/volume over the valid rows only."""
    from raycrawl.pipelines.analytics import table_profile

    d = str(tmp_path)
    _write(d, "documents", pa.table(
        {
            "k": pa.array([7, None, 7, 3], pa.int64()),
            "s": pa.array(["ab", "wxyz", None, "ab"], pa.string()),
        }
    ))
    rows = {r["col"]: r for r in table_profile(d).to_pylist()}
    assert rows["k"] == {"col": "k", "n_nulls": 1, "n_distinct": 2,
                        "lo": 3, "hi": 7, "total_len": 0}
    assert rows["s"] == {"col": "s", "n_nulls": 1, "n_distinct": 2,
                        "lo": 2, "hi": 4, "total_len": 8}


def test_events_hll_by_type_bounds(ray_session):
    """Every per-type estimate within the 4-sigma band of its exact
    distinct count on the gate table (p=12 -> sigma ~1.6%)."""
    from raycrawl.pipelines.relops import events_hll_by_type

    got = {r["event_type"]: r["n_users_hll"]
           for r in events_hll_by_type(SF).to_pylist()}
    t = pq.read_table(os.path.join(SF, "events.parquet"),
                      columns=["event_type", "user_id"])
    g = t.group_by("event_type").aggregate([("user_id", "count_distinct")])
    exact = {k: n for k, n in zip(g["event_type"].to_pylist(),
                                  g["user_id_count_distinct"].to_pylist())}
    assert set(got) == set(exact)
    for ty, est in got.items():
        assert abs(est - exact[ty]) / exact[ty] <= 0.06, (ty, est, exact[ty])


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit1_pairs_planted_edges(ray_session, tmp_path):
    """The semantic edges of symmetric-delete blocking: substitution,
    insertion into a same-char run, and the transposition FALSE candidate
    (shares two variant keys yet lev=2 — must be verified away)."""
    from raycrawl.pipelines.dedup import edit1_pairs

    d = str(tmp_path)
    names = ["ab", "ba", "abc", "abcd", "aaa", "aa", "xyz", "xz", "qqq"]
    _write(d, "customer", pa.table({"c_name": pa.array(names)}))
    got = {(r["name_a"], r["name_b"])
           for r in edit1_pairs(d).take_all()}
    want = {(a, b) for i, a in enumerate(names) for b in names[i + 1:]
            if _lev(a, b) <= 1}
    want = {tuple(sorted(p)) for p in want}
    assert ("ab", "ba") not in got          # transposition rejected
    assert tuple(sorted(("aaa", "aa"))) in got   # run deletion found
    assert got == want


def test_edit1_pairs_fuzz_vs_dp(ray_session, tmp_path):
    """Randomized cross-check vs the DP distance on short low-alphabet
    strings (dense near-pair space: inserts, deletes, substitutions,
    transpositions, duplicates-after-dedup)."""
    from raycrawl.pipelines.dedup import edit1_pairs

    rng = np.random.default_rng(7)
    names = list({
        "".join(rng.choice(list("abc"), size=rng.integers(1, 6)))
        for _ in range(120)
    })
    d = str(tmp_path)
    _write(d, "customer", pa.table({"c_name": pa.array(names)}))
    got = {(r["name_a"], r["name_b"])
           for r in edit1_pairs(d).take_all()}
    want = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if _lev(a, b) <= 1:
                want.add(tuple(sorted((a, b))))
    assert got == want


def test_quantize_i8_contract():
    """The int8 quantization contract: fixed-point floor, magnitude
    floor-division (truncation toward zero — what DuckDB's // computes on
    signed values), zero-vector safe."""
    from raycrawl.pipelines.ann import _quantize_i8

    v = np.array([[0.5, -0.25, 0.125, 0.0],
                  [0.0, 0.0, 0.0, 0.0],
                  [-1.0, 1.0, -0.333333, 0.7]])
    got = _quantize_i8(v)

    def ref(row):
        f = [int(np.floor(x * 1e6)) for x in row]
        m = max(abs(x) for x in f)
        if m == 0:
            return [0] * len(f)
        out = []
        for x in f:
            q = (abs(x) * 127) // m
            out.append(-q if x < 0 else q)
        return out

    for i in range(len(v)):
        assert list(got[i]) == ref(v[i]), (i, list(got[i]), ref(v[i]))
    assert got.min() >= -127 and got.max() <= 127


def test_quantized_topk_planted(ray_session, tmp_path):
    """Planted 2-D embeddings where quantized ranking is hand-checkable
    and DIFFERS from float cosine (quantization collapses near-ties)."""
    from raycrawl.pipelines.ann import quantized_topk

    vecs = {
        0: [1.0, 0.0],       # query
        1: [0.9, 0.1],
        2: [0.5, 0.5],
        3: [-1.0, 0.0],
        4: [0.0, 1.0],
    }
    _write(str(tmp_path), "embeddings", pa.table(
        {
            "vec_id": pa.array(sorted(vecs), pa.int64()),
            "embedding": pa.array([vecs[k] for k in sorted(vecs)],
                                  pa.list_(pa.float32())),
        }
    ))
    t = quantized_topk(str(tmp_path), n_queries=1, k=4).to_pylist()
    assert [r["vec_id"] for r in t] == [1, 2, 4, 3]
    # codes: q0=(127,0); v1 f=(900000,100000) m=900000 -> (127,14);
    # v2 -> (127,127). Both score 127*127 against q0 — float cosine ranks
    # v1 above v2, quantization collapses them to a tie broken by vec_id.
    scores = {r["vec_id"]: r["score_q"] for r in t}
    assert scores[1] == scores[2] == 127 * 127
    assert scores[3] == -127 * 127
    assert scores[4] == 0


def test_budget_alloc_invariants(ray_session):
    """sum(alloc) == budget exactly; every host within 1 slot of its real
    proportional share (the largest-remainder guarantee)."""
    from raycrawl.pipelines.crawlqueries import crawl_budget_alloc

    B = 137  # deliberately awkward
    t = crawl_budget_alloc(SF, budget=B).to_pandas()
    assert int(t["alloc"].sum()) == B
    N = int(t["n_urls"].sum())
    for _, r in t.iterrows():
        exact = B * int(r["n_urls"]) / N
        assert abs(int(r["alloc"]) - exact) < 1.0, (r["host"], exact)
