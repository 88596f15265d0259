"""sf0.1 -> sf1 scale point for the three composition pipelines
(VERDICT r4 ask #7): prepare_report, ccnet_buckets, lm_perplexity at 10x
the sf0.1 documents row count, same 32-cpu session. Generates the sf1
table first if missing (scripts/gen_sf1_documents.py). Prints one JSON
line per (sf, query) plus the 10x wall ratio — the sf0.1 suite costs are
dominated by fixed overheads, so a sub-10x ratio at 10x data evidences
the composition scaling the 100-TB story depends on. Record the output
in BASELINE.md.

Usage: python scripts/bench_sf1.py [repeats]
"""

import json
import os
import subprocess
import sys
import time

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
QUERIES = ["prepare_report", "ccnet_buckets", "lm_perplexity", "kn_perplexity"]


def main():
    if not os.path.exists("/tmp/sf1/documents.parquet"):
        subprocess.run(
            [sys.executable, "scripts/gen_sf1_documents.py"], check=True
        )
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import __ray_entry__ as e

    qs = e.queries()
    qs["token_freq"]("/root/testdata/sf0.1")  # warm the worker pool
    out = {}
    for sf_dir, tag in (("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf1", "sf1")):
        for name in QUERIES:
            best = None
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                r = qs[name](sf_dir)
                if hasattr(r, "materialize"):
                    r.materialize()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[f"{tag}:{name}"] = round(best, 3)
            print(json.dumps({"sf": tag, "query": name, "sec": round(best, 3)}),
                  flush=True)
    ratios = {
        name: round(out[f"sf1:{name}"] / out[f"sf0.1:{name}"], 2)
        for name in QUERIES
    }
    print(json.dumps({"wall_ratio_10x_data": ratios}), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
