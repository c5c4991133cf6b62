"""Planted-truth tests for the window/rollup/semi-anti/pivot and
retrieval operators (the oracle comparisons live in test_oracles_smoke;
these pin the semantic edges: ties, null grouping-set rows, shared-gram
boundaries)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_events(tmp_path_factory):
    """events.parquet with deliberate timestamp ties within one user."""
    d = tmp_path_factory.mktemp("planted_events")
    base = 1_700_000_000_000_000  # us
    rows = [
        # user 7: two events at the SAME ts (the tie the per-(user,ts)
        # collapse makes deterministic), then a later one
        (1, base, 7, "click", 1.00),
        (2, base, 7, "purchase", 2.00),
        (3, base + 5_000_000, 7, "click", 0.50),
        # user 9: single event
        (4, base + 1, 9, "view", 4.25),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(str(d), "events.parquet"),
    )
    return str(d)


def test_user_running_collapses_ts_ties(ray_session, planted_events):
    from raycrawl.pipelines.analytics import events_user_running

    out = (
        events_user_running(planted_events)
        .to_pandas()
        .sort_values(["user_id", "rn"])
        .reset_index(drop=True)
    )
    u7 = out[out["user_id"] == 7]
    # the two tied events collapse to one step of 300 cents
    assert list(u7["rn"]) == [1, 2]
    assert list(u7["step_cents"]) == [300, 50]
    assert list(u7["cum_cents"]) == [300, 350]
    u9 = out[out["user_id"] == 9]
    assert list(u9["cum_cents"]) == [425]


def test_user_paths_tie_order(ray_session, planted_events):
    from raycrawl.pipelines.analytics import events_user_paths

    out = events_user_paths(planted_events).to_pandas().set_index("user_id")
    # user 7's two tied events order by event_id: click(1) then purchase(2)
    assert out.loc[7, "path"] == "click>purchase>click"
    assert out.loc[7, "n_events"] == 3
    assert out.loc[9, "path"] == "view"
    assert out.loc[9, "n_events"] == 1


def test_pivot_row_sums(ray_session, planted_events):
    from raycrawl.pipelines.analytics import events_pivot

    out = events_pivot(planted_events).to_pandas().set_index("user_id")
    assert out.loc[7, "click_cents"] == 150
    assert out.loc[7, "purchase_cents"] == 200
    assert out.loc[7, "n_events"] == 3
    assert out.loc[9, "view_cents"] == 425
    assert out.loc[9, "signup_cents"] == 0


def test_rollup_levels_consistent(ray_session):
    from raycrawl.pipelines.analytics import lineitem_rollup

    out = lineitem_rollup(SF).to_pandas()
    fine = out[out["l_linestatus"].notna()]
    mid = out[out["l_linestatus"].isna() & out["l_returnflag"].notna()]
    top = out[out["l_returnflag"].isna()]
    assert len(top) == 1
    for col in ("sum_qty", "sum_price_cents", "n_items"):
        assert fine[col].sum() == top[col].iloc[0]
        assert mid[col].sum() == top[col].iloc[0]
    # every (flag) mid row equals the sum of its fine rows
    per_flag = fine.groupby("l_returnflag")["n_items"].sum()
    for _, r in mid.iterrows():
        assert per_flag[r["l_returnflag"]] == r["n_items"]


def test_cube_levels_consistent(ray_session):
    from raycrawl.pipelines.analytics import lineitem_cube

    out = lineitem_cube(SF).to_pandas()
    by_status = out[out["l_returnflag"].isna() & out["l_linestatus"].notna()]
    top = out[out["l_returnflag"].isna() & out["l_linestatus"].isna()]
    fine = out[out["l_returnflag"].notna() & out["l_linestatus"].notna()]
    assert len(top) == 1
    for col in ("sum_qty", "sum_price_cents", "n_items"):
        assert by_status[col].sum() == top[col].iloc[0]
    per_status = fine.groupby("l_linestatus")["n_items"].sum()
    for _, r in by_status.iterrows():
        assert per_status[r["l_linestatus"]] == r["n_items"]


def test_semi_anti_partition_customers(ray_session):
    """semi + anti partition the customer set exactly."""
    from raycrawl.pipelines.analytics import (
        customers_with_big_orders,
        customers_without_big_orders,
    )

    n_semi = customers_with_big_orders(SF).to_pandas()["n_customers"].sum()
    n_anti = customers_without_big_orders(SF).to_pandas()["n_customers"].sum()
    n_cust = pq.read_metadata(os.path.join(SF, "customer.parquet")).num_rows
    assert n_semi + n_anti == n_cust
    assert n_semi > 0 and n_anti > 0


@pytest.fixture(scope="module")
def funnel_events(tmp_path_factory):
    """events.parquet with known funnel structure around the 1 h window."""
    d = tmp_path_factory.mktemp("funnel_events")
    base = 1_700_000_000_000_000
    H = 3_600_000_000
    rows = [
        # user 1: purchase 30 min after signup -> converted
        (1, base, 1, "signup", 0.0),
        (2, base + H // 2, 1, "purchase", 5.0),
        # user 2: purchase 2 h after signup -> NOT converted (outside window)
        (3, base, 2, "signup", 0.0),
        (4, base + 2 * H, 2, "purchase", 5.0),
        # user 3: purchase BEFORE signup only -> not converted
        (5, base, 3, "purchase", 5.0),
        (6, base + 1, 3, "signup", 0.0),
        # user 4: purchase exactly AT the window edge -> converted (<=)
        (7, base, 4, "signup", 0.0),
        (8, base + H, 4, "purchase", 5.0),
        # user 5: purchases only, no signup
        (9, base, 5, "purchase", 5.0),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(str(d), "events.parquet"),
    )
    return str(d)


def test_funnel_window_edges(ray_session, funnel_events):
    from raycrawl.pipelines.analytics import events_funnel

    out = events_funnel(funnel_events).to_pandas().iloc[0]
    assert out["n_signup_users"] == 4      # users 1-4
    assert out["n_purchase_users"] == 5    # all five purchase
    assert out["n_converted"] == 2         # users 1 and 4 (edge inclusive)


def test_small_quantity_revenue_bruteforce(ray_session):
    from raycrawl.pipelines.analytics import small_quantity_revenue

    li = pq.read_table(
        os.path.join(SF, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    li["qty"] = li["l_quantity"].astype("int64")
    g = li.groupby("l_partkey")["qty"].agg(["sum", "count"])
    s = g["sum"].reindex(li["l_partkey"]).to_numpy()
    n = g["count"].reindex(li["l_partkey"]).to_numpy()
    keep = 5 * li["qty"].to_numpy() * n < s
    cents = (li["l_extendedprice"] * 100).round().astype("int64").to_numpy()
    out = small_quantity_revenue(SF).to_pandas().iloc[0]
    assert out["n_items"] == int(keep.sum())
    assert out["revenue_cents"] == int(cents[keep].sum())


def _write_events(d, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(str(d), "events.parquet"),
    )
    return str(d)


def test_outliers_z2_planted(ray_session, tmp_path):
    """One spike among flat values is the only z>2 outlier."""
    from raycrawl.pipelines.analytics import events_outliers

    base = 1_700_000_000_000_000
    rows = [(i, base + i, 1, "click", 1.00) for i in range(5)]
    rows.append((5, base + 5, 1, "purchase", 100.00))      # the spike
    rows.append((6, base + 6, 2, "view", 50.00))           # n=1: excluded
    _write_events(tmp_path, rows)
    out = events_outliers(str(tmp_path)).to_pandas()
    assert out.set_index("user_id")["n_outliers"].to_dict() == {1: 1}


def test_cohort_retention_planted(ray_session, tmp_path):
    from raycrawl.pipelines.analytics import events_cohort_retention

    WEEK = 7 * 86_400 * 1_000_000
    W = 2810  # an exact epoch-week boundary
    rows = [
        # user 1: first in week W, active W and W+1 (twice in W+1 —
        # distinct-per-week must count it once)
        (1, W * WEEK + 10, 1, "click", 1.0),
        (2, (W + 1) * WEEK + 5, 1, "view", 1.0),
        (3, (W + 1) * WEEK + 9, 1, "view", 1.0),
        # user 2: first in week W+1 only
        (4, (W + 1) * WEEK + 1, 2, "click", 1.0),
    ]
    _write_events(tmp_path, rows)
    out = events_cohort_retention(str(tmp_path)).to_pandas()
    got = {
        (r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()
    }
    assert got == {(W, 0): 1, (W, 1): 1, (W + 1, 0): 1}


def test_close_pairs_window_edges(ray_session, tmp_path):
    from raycrawl.pipelines.analytics import events_close_pairs

    base = 1_700_000_000_000_000
    W = 300_000_000  # 5 min in us
    rows = [
        # user 1: t, t (tie), t+W (edge inclusive), t+2W+1 (isolated)
        (1, base, 1, "click", 0.0),
        (2, base, 1, "view", 0.0),
        (3, base + W, 1, "click", 0.0),
        (4, base + 2 * W + 1, 1, "click", 0.0),
        # user 2: exactly outside the window
        (5, base, 2, "click", 0.0),
        (6, base + W + 1, 2, "click", 0.0),
    ]
    _write_events(tmp_path, rows)
    out = events_close_pairs(str(tmp_path)).to_pandas()
    # user 1: pairs (1,2),(1,3),(2,3) -> 3; the isolated event adds none;
    # user 2: 0 pairs -> omitted
    assert out.set_index("user_id")["n_pairs"].to_dict() == {1: 3}


def test_close_pairs_fuzz(ray_session, tmp_path):
    """Two-pointer count == O(n²) brute force over random skewed data."""
    rng = np.random.RandomState(7)
    base = 1_700_000_000_000_000
    W = 300_000_000
    rows = []
    eid = 0
    for _ in range(40):
        u = int(rng.randint(1, 6))          # few users -> heavy per-user n
        t = base + int(rng.randint(0, 4 * W))
        rows.append((eid, t, u, "click", 0.0))
        eid += 1
    _write_events(tmp_path, rows)

    from collections import defaultdict

    from raycrawl.pipelines.analytics import events_close_pairs

    per_user = defaultdict(list)
    for _, t, u, _, _ in rows:
        per_user[u].append(t)
    want = {}
    for u, ts in per_user.items():
        n = sum(
            1
            for i in range(len(ts))
            for j in range(i + 1, len(ts))
            if abs(ts[i] - ts[j]) <= W
        )
        if n:
            want[u] = n
    out = events_close_pairs(str(tmp_path)).to_pandas()
    assert out.set_index("user_id")["n_pairs"].to_dict() == want


def test_full_outer_nation_counts(ray_session):
    """Both outer directions vs a pandas brute force at sf0.001."""
    from raycrawl.pipelines.analytics import nation_customer_supplier_outer

    cust = pq.read_table(
        os.path.join(SF, "customer.parquet"),
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    ).to_pandas()
    supp = pq.read_table(
        os.path.join(SF, "supplier.parquet"),
        columns=["s_nationkey", "s_acctbal"],
    ).to_pandas()
    nc = (
        cust[(cust["c_mktsegment"] == "BUILDING") & (cust["c_acctbal"] > 9000)]
        .groupby("c_nationkey")
        .size()
    )
    ns = supp[supp["s_acctbal"] > 5000].groupby("s_nationkey").size()
    out = nation_customer_supplier_outer(SF).to_pandas().set_index("nationkey")
    assert set(out.index) == set(nc.index) | set(ns.index)
    for k in out.index:
        assert out.loc[k, "n_building_customers"] == nc.get(k, 0)
        assert out.loc[k, "n_rich_suppliers"] == ns.get(k, 0)


@pytest.fixture(scope="module")
def gram_docs(tmp_path_factory):
    """documents.parquet where shared-5-gram structure is fully known."""
    d = tmp_path_factory.mktemp("gram_docs")
    shared = "alpha beta gamma delta epsilon"          # exactly one 5-gram
    docs = [
        (0, shared + " zeta eta"),                     # 3 grams, 1 shared
        (1, "prefix " + shared),                       # 2 grams, 1 shared
        (2, "unique words only here nothing repeats"), # no shared grams
        (3, "short text"),                             # too short for any gram
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d)


def test_dup_ngrams_planted(ray_session, gram_docs):
    from raycrawl.pipelines.retrieval import docs_dup_ngrams

    out = docs_dup_ngrams(gram_docs).to_pandas().set_index("doc_id")
    # docs 0 and 1 share exactly the one planted 5-gram; 2 and 3 are absent
    assert set(out.index) == {0, 1}
    assert out.loc[0, "n_shared_grams"] == 1
    assert out.loc[0, "n_shared_positions"] == 1
    assert out.loc[1, "n_shared_grams"] == 1


def test_tfidf_scores_match_bruteforce(ray_session):
    """Integer tf-idf recomputed driver-side from raw tokens."""
    from raycrawl.pipelines.retrieval import (
        TFIDF_SCALE,
        TFIDF_TERMS,
        docs_tfidf_topk,
    )

    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    toks = docs["text"].str.lower().str.split()
    n = len(docs)
    df = {t: int(toks.apply(lambda ws: t in ws).sum()) for t in TFIDF_TERMS}
    w = {t: (n * TFIDF_SCALE) // df[t] for t in TFIDF_TERMS if df[t]}
    score = toks.apply(lambda ws: sum(ws.count(t) * wt for t, wt in w.items()))
    brute = (
        pd.DataFrame({"doc_id": docs["doc_id"], "score": score})
        .query("score > 0")
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    got = docs_tfidf_topk(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"score": "int64"}), brute.astype({"score": "int64"})
    )


@pytest.fixture(scope="module")
def skewed_events(tmp_path_factory):
    """events.parquet where ONE user owns ~95% of the rows — the regime
    the ts-range-salted as-of/range joins exist for. Seeded, with
    duplicate click timestamps, purchase-ts ties (different values), and
    empty stretches so slice boundaries land in every configuration."""
    d = tmp_path_factory.mktemp("skewed_events")
    rng = np.random.RandomState(17)
    base = 1_700_000_000_000_000
    n_hot = 4000
    ts = base + np.sort(rng.randint(0, 3_000_000_000_000, n_hot))
    kinds = rng.choice(["click", "purchase", "view"], n_hot, p=[0.5, 0.3, 0.2])
    rows = {
        "event_id": np.arange(n_hot, dtype=np.int64),
        "ts": ts,
        "user_id": np.full(n_hot, 7, dtype=np.int64),
        "event_type": kinds,
        "value": np.round(rng.uniform(0.5, 99.5, n_hot), 2),
    }
    # a handful of normal users + duplicate-ts rows for the tie paths
    extra_n = 200
    extra = {
        "event_id": np.arange(n_hot, n_hot + extra_n, dtype=np.int64),
        "ts": base + rng.randint(0, 3_000_000_000_000, extra_n),
        "user_id": rng.randint(1, 6, extra_n).astype(np.int64),
        "event_type": rng.choice(["click", "purchase"], extra_n),
        "value": np.round(rng.uniform(0.5, 99.5, extra_n), 2),
    }
    ties = {
        "event_id": np.array([9001, 9002, 9003, 9004], dtype=np.int64),
        "ts": np.array([ts[10], ts[10], ts[20], ts[20]]),
        "user_id": np.array([7, 7, 7, 7], dtype=np.int64),
        "event_type": np.array(["purchase", "purchase", "click", "click"]),
        "value": np.array([10.00, 20.00, 1.00, 1.00]),
    }
    cols = {k: np.concatenate([rows[k], extra[k], ties[k]]) for k in rows}
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols["event_id"], pa.int64()),
                "ts": pa.array(cols["ts"].astype("datetime64[us]")),
                "user_id": pa.array(cols["user_id"], pa.int64()),
                "event_type": pa.array(cols["event_type"].astype(object)),
                "value": pa.array(cols["value"], pa.float64()),
                "props": pa.array(["{}"] * len(cols["ts"])),
            }
        ),
        os.path.join(str(d), "events.parquet"),
    )
    return str(d)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_asof_join_salted_matches_unsalted_and_brute(ray_session, skewed_events):
    from raycrawl.pipelines.relops import events_asof_join

    plain = _norm(events_asof_join(skewed_events).to_pandas())
    for s in (4, 8):
        salted = _norm(
            events_asof_join(skewed_events, salt_slices=s).to_pandas()
        )
        pd.testing.assert_frame_equal(plain, salted, check_dtype=False)

    # brute-force twin straight off the parquet
    ev = pq.read_table(os.path.join(skewed_events, "events.parquet")).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    p = (
        ev[ev.event_type == "purchase"]
        .groupby(["user_id", "ts_us"], as_index=False)["cents"].max()
    )
    rows = []
    for _, c in ev[ev.event_type == "click"].iterrows():
        cand = p[(p.user_id == c.user_id) & (p.ts_us <= c.ts_us)]
        if len(cand):
            best = cand.loc[cand.ts_us.idxmax()]
            rows.append((c.user_id, c.ts_us, best.ts_us, best.cents))
    brute = _norm(
        pd.DataFrame(
            rows,
            columns=["user_id", "click_ts_us", "purchase_ts_us",
                     "purchase_cents"],
        )
    )
    pd.testing.assert_frame_equal(plain, brute, check_dtype=False)


def test_range_join_salted_matches_unsalted_and_brute(ray_session, skewed_events):
    from raycrawl.pipelines.relops import events_range_join

    win_s = 200_000  # ~7% of the ts span: several slices per window config
    plain = _norm(
        events_range_join(skewed_events, window_s=win_s).to_pandas()
    )
    for s in (4, 8, 1024):  # 1024 exercises the width>=window cap
        salted = _norm(
            events_range_join(
                skewed_events, window_s=win_s, salt_slices=s
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(plain, salted, check_dtype=False)

    ev = pq.read_table(os.path.join(skewed_events, "events.parquet")).to_pandas()
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    win_us = win_s * 1_000_000
    p = ev[ev.event_type == "purchase"]
    rows = []
    clicks = ev[ev.event_type == "click"][["user_id", "ts_us"]].drop_duplicates()
    for _, c in clicks.iterrows():
        cand = p[
            (p.user_id == c.user_id)
            & (p.ts_us > c.ts_us - win_us)
            & (p.ts_us <= c.ts_us)
        ]
        if len(cand):
            rows.append((c.user_id, c.ts_us, len(cand), cand.cents.sum()))
    brute = _norm(
        pd.DataFrame(
            rows,
            columns=["user_id", "click_ts_us", "n_purchases",
                     "purchase_cents_sum"],
        )
    )
    pd.testing.assert_frame_equal(plain, brute, check_dtype=False)


def test_urgent_order_revenue_bloom(ray_session, tmp_path):
    """Bloom prefilter must be transparent: planted orders/lineitem where
    most lineitems do NOT belong to urgent orders (the prune case) plus a
    tiny bloom (forced false positives) — the exact join behind the filter
    must still produce the exact answer."""
    from raycrawl.pipelines.relops import urgent_order_revenue

    rng = np.random.RandomState(3)
    n_orders = 400
    prio = np.where(rng.rand(n_orders) < 0.2, "1-URGENT", "3-MEDIUM")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
                "o_orderpriority": pa.array(prio.astype(object)),
            }
        ),
        os.path.join(str(tmp_path), "orders.parquet"),
    )
    n_li = 3000
    lkeys = rng.randint(0, n_orders, n_li).astype(np.int64)
    price = np.round(rng.uniform(1, 500, n_li), 2)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lkeys),
                "l_extendedprice": pa.array(price, pa.float64()),
            }
        ),
        os.path.join(str(tmp_path), "lineitem.parquet"),
    )
    urgent = set(np.where(prio == "1-URGENT")[0])
    mask = np.isin(lkeys, list(urgent))
    want_rev = int(np.round(price * 100)[mask].sum())
    want_n = int(mask.sum())
    # bloom_log2=8 (256 bits for ~80 keys * 4 hashes): false positives
    # certain; result must be exact anyway
    for log2 in (8, 20):
        got = urgent_order_revenue(str(tmp_path), bloom_log2=log2).to_pandas()
        assert got["revenue_cents"].tolist() == [want_rev]
        assert got["n_items"].tolist() == [want_n]


# ---------------------------------------------------------------------------
# round 4: Q13 / Q18 shapes vs DuckDB brute force at sf0.001
# ---------------------------------------------------------------------------


def test_orders_count_distribution_bruteforce(ray_session):
    import duckdb

    from raycrawl.pipelines.analytics import orders_count_distribution

    got = orders_count_distribution(SF).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT CAST(n_orders AS BIGINT) AS n_orders,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM (
          SELECT c_custkey, count(o_orderkey) AS n_orders
          FROM read_parquet('{SF}/customer.parquet') c
          LEFT JOIN read_parquet('{SF}/orders.parquet') o
            ON o_custkey = c_custkey
          GROUP BY c_custkey
        ) GROUP BY n_orders ORDER BY n_orders
        """
    ).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # the distribution covers every customer exactly once
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert got["n_customers"].sum() == n_cust


def test_top_customer_orders_bruteforce(ray_session):
    import duckdb

    from raycrawl.pipelines.analytics import top_customer_orders

    got = (
        top_customer_orders(SF, min_qty=150, k=5)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          FROM read_parquet('{SF}/lineitem.parquet')
          GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS BIGINT)) > 150
        )
        SELECT c_custkey, c_name, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
               total_qty
        FROM big
        JOIN read_parquet('{SF}/orders.parquet') o ON o_orderkey = l_orderkey
        JOIN read_parquet('{SF}/customer.parquet') c ON c_custkey = o_custkey
        ORDER BY o_totalprice_cents DESC, o_orderkey LIMIT 5
        """
    ).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_bm25_scores_match_bruteforce(ray_session):
    import re

    import pyarrow.parquet as pq_

    from raycrawl.pipelines.retrieval import (
        BM25_SCALE,
        TFIDF_TERMS,
        docs_bm25_topk,
    )

    docs = pq_.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    )
    toks = {
        d: re.findall(r"\S+", (t or "").lower())
        for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    n = len(toks)
    t_total = sum(len(v) for v in toks.values())
    score: dict = {}
    for term in TFIDF_TERMS:
        df = sum(1 for v in toks.values() if term in v)
        if not df:
            continue
        idf = ((n - df + 1) * BM25_SCALE) // (df + 1)
        for d, v in toks.items():
            tf = v.count(term)
            if tf:
                tfn = (44 * t_total * tf * BM25_SCALE) // (
                    20 * t_total * tf + 6 * t_total + 18 * len(v) * n
                )
                score[d] = score.get(d, 0) + idf * tfn
    want = sorted(score.items(), key=lambda x: (-x[1], x[0]))[:20]
    got = [
        (r["doc_id"], r["score"]) for r in docs_bm25_topk(SF).take_all()
    ]
    assert got == want


def test_latest_state_planted(ray_session, tmp_path):
    """CDC compaction: latest row wins per user (ts then event_id ties),
    a latest 'error' row tombstones the key."""
    from raycrawl.pipelines.analytics import events_latest_state

    base = 1_700_000_000_000_000
    rows = [
        (1, base + 10, 1, "click", 1.00),
        (2, base + 20, 1, "purchase", 2.50),   # user 1 current row
        (3, base + 5, 2, "view", 9.00),
        (4, base + 6, 2, "error", 0.00),       # user 2 tombstoned
        (5, base + 7, 3, "signup", 4.00),      # same ts as 6 ...
        (6, base + 7, 3, "view", 5.00),        # ... higher event_id wins
    ]
    _write_events(tmp_path, rows)
    out = events_latest_state(str(tmp_path)).to_pandas()
    got = {
        r.user_id: (r.last_type, r.last_ts_us, r.last_cents)
        for r in out.itertuples()
    }
    assert got == {
        1: ("purchase", base + 20, 250),
        3: ("view", base + 7, 500),
    }


def test_latest_state_batch_partial_associative(ray_session, tmp_path):
    """The per-batch pre-compaction must not change results when a user's
    rows span blocks: force tiny blocks and compare against pandas."""
    import numpy as np

    from raycrawl.pipelines.analytics import events_latest_state

    rng = np.random.RandomState(7)
    base = 1_700_000_000_000_000
    rows = []
    for i in range(200):
        rows.append(
            (i, base + int(rng.randint(0, 50)), int(rng.randint(0, 8)),
             ["click", "view", "error"][int(rng.randint(0, 3))],
             float(rng.randint(0, 100)) / 10)
        )
    _write_events(tmp_path, rows)
    out = events_latest_state(str(tmp_path)).to_pandas()

    df = pd.DataFrame(
        rows, columns=["event_id", "ts_us", "user_id", "event_type", "v"]
    )
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    last = df.groupby("user_id").tail(1)
    want = {
        r.user_id: (r.event_type, r.ts_us, int(round(r.v * 100)))
        for r in last.itertuples()
        if r.event_type != "error"
    }
    got = {
        r.user_id: (r.last_type, r.last_ts_us, r.last_cents)
        for r in out.itertuples()
    }
    assert got == want
