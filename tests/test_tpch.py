"""Planted-truth tests for the TPC-H snowflake-join batch (tpch.py).

The oracle comparisons run in the driver gate / check_correctness; these
pin the semantic edges of the ADAPTED predicates: Q4's strict
EXISTS-as-MAX lateness, Q7's same-nation exclusion and direction split,
Q16's distinct-supplier-per-group counting, and Q20's exact share
boundary (share_denom * qty == tot must NOT qualify)."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(d, name, table):
    pq.write_table(table, os.path.join(d, f"{name}.parquet"))


def _ts(y, m, day):
    return dt.datetime(y, m, day)


@pytest.fixture(scope="module")
def planted_q4(tmp_path_factory):
    """Orders with every lateness edge: strictly late, exactly-on-time
    (excluded — the predicate is strict), early, and late-but-wrong-year."""
    d = str(tmp_path_factory.mktemp("planted_q4"))
    _write(d, "orders", pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderdate": pa.array(
                [_ts(1997, 1, 10), _ts(1997, 2, 10), _ts(1997, 3, 10),
                 _ts(1998, 1, 10)],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["P1", "P1", "P2", "P2"]),
        }
    ))
    _write(d, "lineitem", pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
            # order 1: one early + one late line -> MAX is late -> counted
            # order 2: ships exactly ON the order date -> strict > fails
            # order 3: ships early -> not counted
            # order 4: late but 1998 -> outside the year filter
            "l_shipdate": pa.array(
                [_ts(1997, 1, 5), _ts(1997, 1, 20), _ts(1997, 2, 10),
                 _ts(1997, 3, 5), _ts(1998, 2, 1)],
                pa.timestamp("us"),
            ),
        }
    ))
    return d


def test_q4_strict_lateness_and_year(ray_session, planted_q4):
    from raycrawl.pipelines.tpch import q4_late_ship_priority

    rows = q4_late_ship_priority(planted_q4, year=1997).take_all()
    assert {(r["o_orderpriority"], r["n_orders"]) for r in rows} == {("P1", 1)}


@pytest.fixture(scope="module")
def planted_q7(tmp_path_factory):
    """Two trading nations; one same-nation line (excluded) and one
    cross-border line in each direction (different ship years)."""
    d = str(tmp_path_factory.mktemp("planted_q7"))
    _write(d, "nation", pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["NA", "NB", "NC"]),
        }
    ))
    _write(d, "customer", pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_nationkey": pa.array([0, 1, 2], pa.int64()),
        }
    ))
    _write(d, "supplier", pa.table(
        {
            "s_suppkey": pa.array([10, 11, 12], pa.int64()),
            "s_nationkey": pa.array([0, 1, 2], pa.int64()),
        }
    ))
    _write(d, "orders", pa.table(
        {
            "o_orderkey": pa.array([100, 200, 300], pa.int64()),
            "o_custkey": pa.array([1, 2, 3], pa.int64()),
        }
    ))
    # price 10.00 disc 0.05 -> 1000 * 95 = 95000 centi-cents
    _write(d, "lineitem", pa.table(
        {
            "l_orderkey": pa.array([100, 100, 200, 300], pa.int64()),
            "l_suppkey": pa.array([11, 10, 10, 12], pa.int64()),
            "l_shipdate": pa.array(
                [_ts(1997, 5, 1), _ts(1997, 6, 1), _ts(1998, 1, 1),
                 _ts(1997, 1, 1)],
                pa.timestamp("us"),
            ),
            "l_extendedprice": pa.array([10.0, 10.0, 10.0, 10.0]),
            "l_discount": pa.array([0.05, 0.05, 0.05, 0.05]),
        }
    ))
    return d


def test_q7_direction_split_and_same_nation_exclusion(ray_session, planted_q7):
    from raycrawl.pipelines.tpch import q7_nation_trade_volume

    rows = q7_nation_trade_volume(planted_q7, "NA", "NB").take_all()
    got = {
        (r["supp_nation"], r["cust_nation"], r["l_year"], r["revenue_ccents"])
        for r in rows
    }
    # (100, supp 10 -> cust 1) is NA->NA: excluded; nation NC untouched
    assert got == {("NB", "NA", 1997, 95000), ("NA", "NB", 1998, 95000)}


@pytest.fixture(scope="module")
def planted_q16(tmp_path_factory):
    """A supplier shipping TWO parts of the same (brand, type, size) must
    count once; the excluded brand must vanish."""
    d = str(tmp_path_factory.mktemp("planted_q16"))
    _write(d, "part", pa.table(
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#5"]),
            "p_type": pa.array(["T", "T", "T"]),
            "p_size": pa.array([5, 5, 5], pa.int64()),
        }
    ))
    _write(d, "lineitem", pa.table(
        {
            # supp 1 ships parts 1 AND 2 (same group -> counts once);
            # supp 2 ships part 1; supp 3 only the excluded brand
            "l_partkey": pa.array([1, 2, 1, 3], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 3], pa.int64()),
        }
    ))
    return d


def test_q16_distinct_supplier_count(ray_session, planted_q16):
    from raycrawl.pipelines.tpch import q16_supplier_variety

    rows = q16_supplier_variety(planted_q16, exclude_brand="Brand#5").take_all()
    assert [
        (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"]) for r in rows
    ] == [("Brand#1", "T", 5, 2)]


@pytest.fixture(scope="module")
def planted_q20(tmp_path_factory):
    """Share boundary: share_denom * qty == tot must NOT qualify (strict >),
    one-above must; non-matching part names never enter."""
    d = str(tmp_path_factory.mktemp("planted_q20"))
    _write(d, "part", pa.table(
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": pa.array(["red bolt", "red gear", "blue rod"]),
        }
    ))
    _write(d, "supplier", pa.table(
        {
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["S1", "S2", "S3"]),
        }
    ))
    # part 1 (tot 16): supp 1 qty 2 -> 8*2 == 16, NOT >; supp 2 qty 14 -> in
    # part 2 (tot 5): supp 3 sole supplier qty 5 -> 8*5 > 5 -> in
    # part 3: name does not match -> supp 1's qty 100 there never counts
    _write(d, "lineitem", pa.table(
        {
            "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_suppkey": pa.array([1, 2, 3, 1], pa.int64()),
            "l_quantity": pa.array([2.0, 14.0, 5.0, 100.0]),
        }
    ))
    return d


def test_q20_share_boundary(ray_session, planted_q20):
    from raycrawl.pipelines.tpch import q20_dominant_suppliers

    rows = q20_dominant_suppliers(planted_q20, name_word="red").take_all()
    got = {(r["s_suppkey"], r["s_name"], r["n_parts"]) for r in rows}
    assert got == {(2, "S2", 1), (3, "S3", 1)}


def test_star_disallow_prefixes_groups_and_edges():
    from raycrawl.pipelines.crawlqueries import star_disallow_prefixes

    text = (
        "User-agent: EvilBot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private\nDisallow: /tmp\nAllow: /\n"
        "Disallow:\n\n"          # empty prefix ignored
        "User-agent: Other\nDisallow: /other\n\n"
        "User-agent: *\nDisallow: /second-group\n"
    )
    assert star_disallow_prefixes(text) == [
        "/private", "/tmp", "/second-group"
    ]
    assert star_disallow_prefixes("") == []
    assert star_disallow_prefixes("Disallow: /orphan\n") == []


def test_coarse_distinct_exact_with_nul_strings(ray_session):
    """coarse_distinct must equal the TRUE distinct set on mixed
    int/string keys including embedded NULs. The reference is a Python
    set — NOT pandas drop_duplicates, whose khash factorization treats
    object strings as C strings and collapses 'a', 'a\\x00b' and
    'a\\x00c' into one row (the sharp edge coarse_distinct's Arrow dedup
    exists to avoid)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.pipelines.dedup import coarse_distinct

    rng = np.random.default_rng(7)
    n = 5000
    strs = ["a\x00b", "a\x00c", "a", "b", "x\x00", "x"]
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 40, n).astype("int64"),
            "k2": [strs[i] for i in rng.integers(0, len(strs), n)],
        }
    )
    # document the pandas sharp edge itself so a behavior change surfaces:
    # the MULTI-column dedup path collapses NUL-distinct strings
    tiny = pd.DataFrame({"k1": [0, 0, 0], "k": ["a", "a\x00b", "a\x00c"]})
    assert len(tiny.drop_duplicates(["k1", "k"])) == 1

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = {
        (r["k1"], r["k2"])
        for r in coarse_distinct(ds, ["k1", "k2"], 15).take_all()
    }
    want = set(zip(df["k1"].tolist(), df["k2"].tolist()))
    assert got == want


@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_docs"))
    _write(d, "documents", pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["", "Hi.", "a a b"]),
        }
    ))
    return d


def test_ttr_and_readability_edges(ray_session, planted_docs):
    """Zero-token and zero-sentence documents must hit the GREATEST
    guards, not divide by zero; TTR counts distinct vs total tokens."""
    from raycrawl.pipelines.textops import readability, ttr

    t = {r["doc_id"]: r for r in ttr(planted_docs).take_all()}
    assert (t[1]["n_tokens"], t[1]["n_types"], t[1]["ttr_4096"]) == (0, 0, 0)
    assert (t[3]["n_tokens"], t[3]["n_types"]) == (3, 2)
    assert t[3]["ttr_4096"] == 4096 * 2 // 3

    r = {x["doc_id"]: x for x in readability(planted_docs).take_all()}
    assert r[1]["fk_grade_1000"] == -15590  # empty doc: all guards at 1
    # "Hi.": w=1 s=1 sy=1 -> 390 + 11800 - 15590
    assert (r[2]["n_words"], r[2]["n_sentences"], r[2]["n_syllables"]) == (1, 1, 1)
    assert r[2]["fk_grade_1000"] == 390 + 11800 - 15590


def test_coarse_sum_exact_with_nul_strings(ray_session):
    """coarse_sum must equal a Python-dict grouped sum, including
    NUL-embedded string keys (same Arrow-dedup contract as
    coarse_distinct)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raycrawl.pipelines.dedup import coarse_sum

    rng = np.random.default_rng(11)
    n = 4000
    keys = ["t", "t\x00a", "t\x00b", "u", "v\x00"]
    df = pd.DataFrame(
        {
            "k": [keys[i] for i in rng.integers(0, len(keys), n)],
            "n": rng.integers(1, 9, n).astype("int64"),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = {
        r["k"]: r["n"] for r in coarse_sum(ds, ["k"], ["n"], 7).take_all()
    }
    want: dict = {}
    for k, v in zip(df["k"], df["n"]):
        want[k] = want.get(k, 0) + int(v)
    assert got == want
