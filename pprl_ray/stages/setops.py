"""Distributed set operations over (key, element) tables.

``pairwise_jaccard``: EXACT Jaccard similarity between every pair of key
groups' element sets — the corpus-overlap matrix ("how much does web share
with wiki?"). Not in the reference (its Jaccard is bit-vector based,
`pprl_core/similarity.py:67-80`); this is the set-theoretic counterpart a
training-data pipeline needs for source-overlap audits.

Scale shape (for key cardinality <= 63): each distinct (key, element) row
becomes a single bit ``1 << key_index``; one native Sum-groupby per element
ORs the bits (rows are distinct, so sum == or); the resulting per-element
key-set masks are counted (tiny table: one row per DISTINCT key-set) and
the full pairwise intersection matrix falls out of one driver-side
``bits.T @ (bits * count)`` matmul. Elements never pairwise-join; the only
shuffle is the element groupby of pre-deduplicated rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pairwise_jaccard"]


def pairwise_jaccard(distinct_ds, key_col: str, element_col: str) -> pd.DataFrame:
    """``distinct_ds``: Dataset of DISTINCT (key, element) rows (dedup them
    upstream, e.g. with a count groupby). Returns a DataFrame
    ``(key_a, key_b, jaccard)`` for every unordered key pair, key_a < key_b.
    """
    from ray.data.aggregate import Count, Sum

    keys = sorted(
        r[key_col] for r in distinct_ds.groupby(key_col).aggregate(Count()).take_all()
    )
    if len(keys) > 63:
        raise NotImplementedError(
            f"{len(keys)} keys > 63: bitmask encoding needs one bit per key; "
            "partition the key space and merge the per-partition matrices"
        )
    key_idx = {k: i for i, k in enumerate(keys)}

    def _mask(batch: pa.Table) -> pa.Table:
        bits = np.array(
            [1 << key_idx[k] for k in batch[key_col].to_pylist()], dtype=np.int64
        )
        return pa.table({element_col: batch[element_col], "mask": pa.array(bits)})

    # distinct rows => Sum of single-bit masks == bitwise OR per element
    per_element = (
        distinct_ds.map_batches(_mask, batch_format="pyarrow")
        .groupby(element_col)
        .aggregate(Sum("mask", alias_name="mask"))
    )
    # one row per DISTINCT key-set: tiny (bounded by element count, in
    # practice a few thousand patterns)
    mask_counts = per_element.groupby("mask").aggregate(Count(alias_name="n")).take_all()

    masks = np.array([r["mask"] for r in mask_counts], dtype=np.int64)
    counts = np.array([r["n"] for r in mask_counts], dtype=np.int64)
    bits = ((masks[:, None] >> np.arange(len(keys))[None, :]) & 1).astype(np.int64)
    inter = bits.T @ (bits * counts[:, None])  # (k, k) intersection sizes
    sizes = np.diag(inter)

    rows = []
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            union = sizes[i] + sizes[j] - inter[i, j]
            rows.append(
                {
                    "key_a": keys[i],
                    "key_b": keys[j],
                    "jaccard": round(float(inter[i, j] / union) if union else 1.0, 6),
                }
            )
    return pd.DataFrame(rows)
