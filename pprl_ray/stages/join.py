"""Broadcast hash join: the scale-correct join when one side is small.

The reference's only join is the crosswise θ-join on similarity
(`/root/reference/packages/pprl_service/pprl_service/routers/match.py:54-67`,
broadcast in ``stages/match.py``); equi-joins are an extension a training-
data pipeline needs (dim tables, metadata enrichment).

Scale shape: the small side is materialized ONCE into the object store
(``ray.put``) and every map task joins its batch against the shared table
zero-copy via ``pyarrow.Table.join`` — no all-to-all exchange of the large
side, no per-batch reserialization. For two large sides, pre-bucket both by
key hash and join bucket-wise instead (not needed by any current pipeline).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["broadcast_join"]


def broadcast_join(large_ds, small_ds, keys, right_keys=None, join_type: str = "inner",
                   **map_kwargs):
    """Join each batch of ``large_ds`` against the materialized ``small_ds``.

    ``keys``/``right_keys`` follow ``pyarrow.Table.join`` semantics;
    ``join_type``: "inner" | "left outer" | etc. (pyarrow names)."""
    import ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    right = pa.concat_tables(
        [b for b in small_ds.iter_batches(batch_format="pyarrow", batch_size=65536)]
    ) if hasattr(small_ds, "iter_batches") else small_ds
    ref = ray.put(right)

    def _join(batch: pa.Table) -> pa.Table:
        rt = ray.get(ref)  # zero-copy from the local object store
        return batch.join(rt, keys=keys, right_keys=right_keys, join_type=join_type)

    return large_ds.map_batches(_join, batch_format="pyarrow", **map_kwargs)
