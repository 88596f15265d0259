"""Distributed set operations over (key, element) tables.

``pairwise_jaccard``: EXACT Jaccard similarity between every pair of key
groups' element sets — the corpus-overlap matrix ("how much does web share
with wiki?"). Not in the reference (its Jaccard is bit-vector based,
`pprl_core/similarity.py:67-80`); this is the set-theoretic counterpart a
training-data pipeline needs for source-overlap audits.

Scale shape (for key cardinality <= 63): each distinct (key, element) row
becomes a single bit ``1 << key_index``; elements hash-partition
(``hash(element) % P``) and ONE vectorised pandas groupby-sum per partition
group ORs the bits (rows are distinct, so sum == or) AND counts the
resulting key-set patterns — Ray-native aggregates would pay ~0.3 ms of
per-DISTINCT-group Python over O(vocabulary) element groups. Only tiny
(mask, n) partials — P × distinct-key-set rows — reach the driver, where
the full pairwise intersection matrix falls out of one
``bits.T @ (bits * count)`` matmul. Elements never pairwise-join; the only
all-to-all is the partition groupby of pre-deduplicated rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pairwise_jaccard"]


def pairwise_jaccard(
    distinct_ds, key_col: str, element_col: str, partitions: int | None = None
) -> pd.DataFrame:
    """``distinct_ds``: Dataset of DISTINCT (key, element) rows (dedup them
    upstream, e.g. with a count groupby). Returns a DataFrame
    ``(key_a, key_b, jaccard)`` for every unordered key pair, key_a < key_b.
    """
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(distinct_ds)

    # key discovery without a shuffle: per-batch unique -> tiny driver union
    uniq = distinct_ds.map_batches(
        lambda b: pa.table({key_col: pc.unique(b[key_col])}), batch_format="pyarrow"
    ).take_all()
    keys = sorted({r[key_col] for r in uniq})
    if len(keys) > 63:
        raise NotImplementedError(
            f"{len(keys)} keys > 63: bitmask encoding needs one bit per key; "
            "partition the key space and merge the per-partition matrices"
        )
    key_idx = {k: i for i, k in enumerate(keys)}

    def _mask(batch: pa.Table) -> pa.Table:
        import polars as pl

        idx = batch[key_col].to_pandas().map(key_idx).to_numpy().astype(np.int64)
        el = batch[element_col]
        if isinstance(el, pa.ChunkedArray):
            el = el.combine_chunks()
        h = pl.from_arrow(el).hash(seed=59).to_numpy()
        return pa.table(
            {
                element_col: batch[element_col],
                "mask": pa.array(np.left_shift(np.int64(1), idx)),
                "part": pa.array((h % np.uint64(partitions)).astype(np.int32)),
            }
        )

    # per partition group: one C groupby-sum ORs the bits per element
    # (distinct rows => sum == or), then a value_counts collapses to
    # (key-set mask, n) partials — tiny, so the driver-side merge is free
    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        per_element = group.groupby(element_col)["mask"].sum()
        vc = per_element.value_counts()
        return pd.DataFrame(
            {"mask": vc.index.to_numpy(np.int64), "n": vc.to_numpy(np.int64)}
        )

    partials = (
        distinct_ds.map_batches(_mask, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_fold, batch_format="pandas")
        .take_all()
    )
    merged = pd.DataFrame(partials).groupby("mask", as_index=False)["n"].sum()

    masks = merged["mask"].to_numpy(dtype=np.int64)
    counts = merged["n"].to_numpy(dtype=np.int64)
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
