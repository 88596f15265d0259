"""Measure skew_join vs bucket_join on a planted-skew fact⋈dim join.

Synthesizes a fact table with a configurable fraction of rows on ONE hot
key (the zipf-head shape that turns a hash-bucket join into a single
straggler task) plus a uniform dim table, then times:

  1. bucket_join            (hot key concentrates in one bucket)
  2. skew_join, hot known   (no detection pass)
  3. skew_join, detected    (includes the Misra-Gries pass)

Row counts are asserted equal across all three. Usage:

  python scripts/bench_skew_join.py [n_fact] [hot_frac] [n_keys]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    import ray

    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import ray.data as rd

    from pprl_ray.stages.join import bucket_join, skew_join

    rng = np.random.default_rng(7)
    keys = np.where(
        rng.random(n_fact) < hot_frac, 17, rng.integers(0, n_keys, n_fact)
    ).astype(np.int64)
    fact_path = "/tmp/skewbench_fact.parquet"
    dim_path = "/tmp/skewbench_dim.parquet"
    pq.write_table(
        pa.table({"k": keys, "v": np.arange(n_fact, dtype=np.int64)}),
        fact_path,
        row_group_size=1 << 20,
    )
    pq.write_table(
        pa.table(
            {
                "dk": np.arange(n_keys, dtype=np.int64),
                "dv": (np.arange(n_keys, dtype=np.int64) * 3) % 97,
            }
        ),
        dim_path,
    )

    from pprl_ray.stages.partitioning import read_parquet_sized

    def fact():
        return read_parquet_sized(fact_path)

    def dim():
        return read_parquet_sized(dim_path)

    results = {}

    def run(name, fn):
        t0 = time.perf_counter()
        n = fn().count()
        dt = time.perf_counter() - t0
        results[name] = {"rows": n, "sec": round(dt, 2)}
        print(f"{name}: {n} rows in {dt:.2f}s", flush=True)

    run("bucket_join", lambda: bucket_join(fact(), dim(), keys="k", right_keys="dk"))
    run(
        "skew_join_known_hot",
        lambda: skew_join(fact(), dim(), keys="k", right_keys="dk", hot_keys={17}),
    )
    run(
        "skew_join_detected",
        lambda: skew_join(
            fact(), dim(), keys="k", right_keys="dk", hot_threshold=0.05
        ),
    )
    rows = {r["rows"] for r in results.values()}
    assert len(rows) == 1, f"row-count mismatch across paths: {results}"
    import json

    print(json.dumps({"n_fact": n_fact, "hot_frac": hot_frac, **results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
