"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on an sf dir, compare row count, schema
(sorted column names), and an order-insensitive value hash.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    # canonical row order: sort by all columns
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa
            print(f"[ENGINE-ERROR] {name}: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: rows={len(mine)} cols={sorted(mine.columns)} ({t1-t0:.1f}s)")
            continue
        try:
            ref = con.sql(oracles[name]).df()
        except Exception as e:  # noqa
            print(f"[SQL-ERROR] {name}: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t2 = time.time()
        ok_rows = len(mine) == len(ref)
        ok_schema = sorted(mine.columns) == sorted(ref.columns)
        ok_hash = ok_rows and ok_schema and value_hash(mine) == value_hash(ref)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        print(f"[{status}] {name}: rows {len(mine)}/{len(ref)} schema={ok_schema} "
              f"hash={'=' if ok_hash else 'X'} (engine {t1-t0:.1f}s, sql {t2-t1:.1f}s)")
        if status != "OK":
            failures.append(name)
            if ok_schema and ok_rows:
                m = mine[sorted(mine.columns)].sort_values(by=sorted(mine.columns)).reset_index(drop=True)
                r = ref[sorted(ref.columns)].sort_values(by=sorted(ref.columns)).reset_index(drop=True)
                diff = (m != r).any(axis=1)
                print("  first diffs (engine vs oracle):")
                print(pd.concat([m[diff].head(3).add_suffix("_eng"),
                                 r[diff].head(3).add_suffix("_sql")], axis=1).to_string())
            else:
                print(f"  engine cols: {sorted(mine.columns)}; sql cols: {sorted(ref.columns)}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
