"""One-pass column-level table profiling (data-quality stats).

For every column: row count, null count, min/max (numeric or
lexicographic), and distinct count via the Theta/KMV sketch — computed in
a SINGLE scan of the table. Each batch emits one tiny partial row per
column (counts + extrema + a theta blob); only those partials move, and
the driver folds the per-column partials in canonical blob order (the
same load-independence rule as every sketch merge here).

Distinct counts are EXACT while a column's cardinality stays below the
sketch capacity ``k`` (KMV keeps the k smallest hashes) and ±1/√(k−2)
relative beyond it — the theta precedent from ``theta_distinct_parts``:
pick k above the cardinality you need exact, let the estimator take over
at scale. String values are pre-hashed (vectorised xxhash) before the
sketch; numeric extrema are tracked as float64, string extrema
lexicographically.

Reference parity: none (the reference has no table-level surface); this
is the data-quality/profiling extension a training-data pipeline runs
before ingesting a new corpus drop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches import ThetaSketch

__all__ = ["table_profile"]


def table_profile(ds, columns: list[str], theta_k: int = 65536) -> pd.DataFrame:
    """Profile ``columns`` of ``ds`` in one streaming pass; returns a
    pandas frame ``(column, n_rows, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str)`` with one row per column."""

    def _partials(batch: pa.Table) -> pa.Table:
        import polars as pl

        out = {
            "column": [], "n": [], "nulls": [],
            "min_num": [], "max_num": [], "min_str": [], "max_str": [],
            "blob": [],
        }
        for col in columns:
            arr = batch[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            nulls = arr.null_count
            valid = arr.drop_null()
            is_num = pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)
            sk = ThetaSketch(theta_k)
            min_num = max_num = None
            min_str = max_str = None
            if len(valid):
                if is_num:
                    vals = valid.to_numpy(zero_copy_only=False).astype(np.float64)
                    min_num = float(vals.min())
                    max_num = float(vals.max())
                    ints = valid.cast(pa.int64()).to_numpy(zero_copy_only=False) \
                        if pa.types.is_integer(arr.type) else None
                    if ints is not None:
                        sk.update(ints)
                    else:
                        # float columns: hash the raw bits
                        sk.update(vals.view(np.int64))
                else:
                    s = pl.from_arrow(valid.cast(pa.string()))
                    min_str = s.min()
                    max_str = s.max()
                    sk.update_unique(
                        np.unique(s.hash(seed=131).to_numpy().astype(np.uint64)).view(
                            np.int64
                        )
                    )
            out["column"].append(col)
            out["n"].append(n)
            out["nulls"].append(nulls)
            out["min_num"].append(min_num)
            out["max_num"].append(max_num)
            out["min_str"].append(min_str)
            out["max_str"].append(max_str)
            out["blob"].append(sk.to_bytes())
        return pa.table(
            {
                "column": pa.array(out["column"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "nulls": pa.array(out["nulls"], pa.int64()),
                "min_num": pa.array(out["min_num"], pa.float64()),
                "max_num": pa.array(out["max_num"], pa.float64()),
                "min_str": pa.array(out["min_str"], pa.string()),
                "max_str": pa.array(out["max_str"], pa.string()),
                "blob": pa.array(out["blob"], pa.binary()),
            }
        )

    rows = ds.map_batches(_partials, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["column"], r["blob"]))  # canonical merge order
    acc: dict[str, dict] = {}
    for r in rows:
        a = acc.setdefault(
            r["column"],
            {"n": 0, "nulls": 0, "min_num": None, "max_num": None,
             "min_str": None, "max_str": None, "sk": ThetaSketch(theta_k)},
        )
        a["n"] += r["n"]
        a["nulls"] += r["nulls"]
        for key, better in (("min_num", min), ("max_num", max),
                            ("min_str", min), ("max_str", max)):
            if r[key] is not None:
                a[key] = r[key] if a[key] is None else better(a[key], r[key])
        a["sk"].merge(ThetaSketch.from_bytes(r["blob"]))
    recs = [
        {
            "column": c,
            "n_rows": a["n"],
            "n_nulls": a["nulls"],
            "n_distinct": int(round(a["sk"].estimate())),
            "min_num": a["min_num"],
            "max_num": a["max_num"],
            "min_str": a["min_str"],
            "max_str": a["max_str"],
        }
        for c, a in acc.items()
    ]
    order = {c: i for i, c in enumerate(columns)}
    recs.sort(key=lambda r: order[r["column"]])
    return pd.DataFrame(recs)
