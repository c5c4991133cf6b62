"""Local simulation of the driver's correctness gate.

Runs every queries() entry at a given sf against its oracle_sql() twin in
DuckDB: row-count + column-name + order-insensitive value comparison.
Usage: python tools/check_correctness.py [sf_dir] [--only q1,q2,...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # the crawl oracles read a corpus synthesized at the DRIVER's gate
    # scale (sf0.01, the literal path baked into the SQL) — at any other
    # sf the comparison is apples-to-oranges, so skip rather than FAIL
    pinned = entrymod._SF001_CORPUS.split("/corpus/")[0].rsplit("/", 1)[-1]
    at_pinned_sf = os.path.basename(os.path.normpath(sf_dir)) == pinned
    failures = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        if name.startswith("crawl_") and not at_pinned_sf:
            print(f"skip  {name}: crawl oracle pinned to {pinned}")
            continue
        try:
            ours = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(ours)} rows (no oracle)")
            continue
        theirs = normalize(con.execute(oracles[name]).fetchdf())
        status = "ok"
        if list(ours.columns) != list(theirs.columns):
            status = f"COLS ours={list(ours.columns)} oracle={list(theirs.columns)}"
        elif len(ours) != len(theirs):
            status = f"ROWS ours={len(ours)} oracle={len(theirs)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    ours, theirs, check_dtype=False, check_exact=True
                )
            except AssertionError as exc:
                status = "VALUES " + str(exc).splitlines()[-1][:120]
        flag = "ok   " if status == "ok" else "FAIL "
        if status != "ok":
            failures.append(name)
        print(f"{flag} {name}: {len(ours)} rows {'' if status == 'ok' else status}")

    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    main(args[0] if args else "/root/testdata/sf0.01", only)
