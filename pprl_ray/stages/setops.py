"""Distributed set operations over (key, element) tables.

``pairwise_jaccard``: EXACT Jaccard similarity between every pair of key
groups' element sets — the corpus-overlap matrix ("how much does web share
with wiki?"). Not in the reference (its Jaccard is bit-vector based,
`pprl_core/similarity.py:67-80`); this is the set-theoretic counterpart a
training-data pipeline needs for source-overlap audits.

Scale shape: each distinct (key, element) row becomes a single bit in a
``ceil(k/63)``-word bitmask (63 usable bits per int64 word keeps every
word non-negative); elements hash-partition (``hash(element) % P``) and
ONE vectorised pandas groupby-sum per partition group ORs the bits (rows
are distinct, so sum == or) AND counts the resulting key-set patterns —
Ray-native aggregates would pay ~0.3 ms of per-DISTINCT-group Python over
O(vocabulary) element groups. Only tiny (mask words, n) partials —
P × distinct-key-set rows — reach the driver, where the full pairwise
intersection matrix falls out of one ``bits.T @ (bits * count)`` matmul.
Elements never pairwise-join; the only all-to-all is the partition groupby
of pre-deduplicated rows.

Key-cardinality note: the partials are one row per DISTINCT key-set
pattern per partition — bounded by the element vocabulary, not by k, so
the exact path stays cheap while patterns are sparse (the realistic
source-overlap case). For thousands of keys with dense overlap patterns,
the theta-sketch path (``theta_source_overlap``) is the approximate
scale alternative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["pairwise_jaccard"]

_BITS_PER_WORD = 63  # keep int64 words non-negative


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
    k = len(keys)
    n_words = max(1, -(-k // _BITS_PER_WORD))
    word_cols = [f"mask_{w}" for w in range(n_words)]
    key_idx = {key: i for i, key in enumerate(keys)}

    def _mask(batch: pa.Table) -> pa.Table:
        import polars as pl

        idx = batch[key_col].to_pandas().map(key_idx).to_numpy().astype(np.int64)
        el = batch[element_col]
        if isinstance(el, pa.ChunkedArray):
            el = el.combine_chunks()
        h = pl.from_arrow(el).hash(seed=59).to_numpy()
        cols = {element_col: batch[element_col]}
        word_of = idx // _BITS_PER_WORD
        bit_of = idx % _BITS_PER_WORD
        for w in range(n_words):
            cols[f"mask_{w}"] = pa.array(
                np.where(word_of == w, np.left_shift(np.int64(1), bit_of), np.int64(0))
            )
        cols["part"] = pa.array((h % np.uint64(partitions)).astype(np.int32))
        return pa.table(cols)

    # per partition group: one C groupby-sum ORs the bits per element
    # (distinct rows => sum == or per word), then a pattern groupby
    # collapses to (key-set words, n) partials — tiny, so the driver-side
    # merge is free
    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        per_element = group.groupby(element_col)[word_cols].sum()
        return per_element.groupby(word_cols, as_index=False).size().rename(
            columns={"size": "n"}
        )

    partials = (
        distinct_ds.map_batches(_mask, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_fold, batch_format="pandas")
        .take_all()
    )
    merged = pd.DataFrame(partials).groupby(word_cols, as_index=False)["n"].sum()

    counts = merged["n"].to_numpy(dtype=np.int64)
    # (patterns, k) bit matrix assembled word by word
    bit_chunks = []
    for w in range(n_words):
        words = merged[f"mask_{w}"].to_numpy(dtype=np.int64)
        width = min(_BITS_PER_WORD, k - w * _BITS_PER_WORD)
        bit_chunks.append(((words[:, None] >> np.arange(width)[None, :]) & 1).astype(np.int64))
    bits = np.concatenate(bit_chunks, axis=1) if bit_chunks else np.zeros((0, k), np.int64)
    inter = bits.T @ (bits * counts[:, None])  # (k, k) intersection sizes
    sizes = np.diag(inter)

    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            union = sizes[i] + sizes[j] - inter[i, j]
            rows.append(
                {
                    "key_a": keys[i],
                    "key_b": keys[j],
                    "jaccard": round(float(inter[i, j] / union) if union else 1.0, 6),
                }
            )
    return pd.DataFrame(rows)
