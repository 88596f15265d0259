"""Event-time windowing operators.

``sessionize``: gap-based session windows per key (the classic stateful
streaming operator, expressed batch-side): events of one user belong to the
same session while consecutive gaps stay under ``gap``. Not in the
reference (it has no streaming semantics, SURVEY.md §2.8); this is the
windowed-aggregate extension the graft calls for.

Scale shape: one shuffle by ``hash(key) % partitions`` co-locates each
key's events (same-key rows always share a partition, so sessionization
within the partition group is exact); per group the work is ONE vectorised
pandas pass (sort + diff + cumsum), so per-group Python overhead is
O(partitions), not O(keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["sessionize"]


def _hash_partition(col: "pa.ChunkedArray | pa.Array", partitions: int) -> "np.ndarray":
    """Dtype-agnostic partition ids for a key column (polars 64-bit hash —
    works for strings, ints, etc.; same key always lands in one partition)."""
    import polars as pl

    if hasattr(col, "combine_chunks"):
        col = col.combine_chunks()
    h = pl.from_arrow(col).hash(seed=97).to_numpy()
    return (h % np.uint64(partitions)).astype(np.int32)



def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: float = 30.0, partitions: int | None = None):
    """Dataset of events -> Dataset of sessions
    ``(key, session_start, session_end, n_events)``. ``partitions``
    defaults to input-size-derived (:func:`.partitioning.auto_partitions`)
    so per-group memory stays flat as inputs grow."""
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)

    def _part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pa.array(_hash_partition(batch[key_col], partitions))
        )

    parted = ds.map_batches(_part, batch_format="pyarrow")

    gap = pd.Timedelta(minutes=gap_minutes)

    def _sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col]).reset_index(drop=True)
        new_sess = (g[key_col] != g[key_col].shift()) | (
            (g[ts_col] - g[ts_col].shift()) > gap
        )
        sess_id = new_sess.cumsum()
        out = g.groupby(sess_id).agg(
            **{
                key_col: (key_col, "first"),
                "session_start": (ts_col, "min"),
                "session_end": (ts_col, "max"),
                "n_events": (ts_col, "size"),
            }
        )
        return out.reset_index(drop=True)

    return parted.groupby("part").map_groups(_sessions, batch_format="pandas")
