"""Driver-simulation: run every queries() entry at a given sf, compare
against oracle_sql() via DuckDB (row count + schema names + order-insensitive
value comparison). Usage: python scripts/check_oracles.py [sf_dir] [name...]"""

import sys
import time

sys.path.insert(0, ".")


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(res)} rows, cols={list(res.columns)} ({wall:.1f}s)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {ex}")
            continue
        a, b = normalize(res), normalize(exp)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
        elif len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
        elif not a.equals(b):
            failures.append(name)
            diff = (a != b).any(axis=1)
            print(f"FAIL  {name}: value mismatch on {diff.sum()} rows")
            print(a[diff].head(3))
            print(b[diff].head(3))
        else:
            print(f"OK    {name}: {len(a)} rows match ({wall:.1f}s)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
