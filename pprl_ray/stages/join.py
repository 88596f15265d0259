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

__all__ = ["broadcast_join", "asof_join", "interval_join"]


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


def asof_join(left_ds, right_ds, key_col: str, ts_col: str,
              right_suffix: str = "_r", partitions: int = 64):
    """As-of (backward) join: for each left row, attach the LATEST right row
    with ``right.ts <= left.ts`` for the same key; left rows without a match
    keep nulls (LEFT ASOF semantics, matching DuckDB ``ASOF LEFT JOIN``).

    Scale shape: both sides are tagged and hash-partitioned by key in ONE
    union shuffle (same-key rows of both sides co-locate, so the as-of
    match within a partition group is exact); per group the work is one
    vectorised ``pandas.merge_asof`` over the partition's sorted rows —
    per-group Python is O(partitions), not O(keys)."""
    import numpy as np

    left_schema = left_ds.schema().base_schema
    right_schema = right_ds.schema().base_schema
    left_cols = list(left_schema.names)
    # right columns as they appear in the union (key shared; everything else
    # suffixed, including the timestamp)
    right_renamed = {
        c: (c + right_suffix if c != key_col else c) for c in right_schema.names
    }
    right_cols_u = [right_renamed[c] for c in right_schema.names if c != key_col]
    union_fields = [(c, left_schema.field(c).type) for c in left_cols] + [
        (right_renamed[c], right_schema.field(c).type)
        for c in right_schema.names
        if c != key_col
    ]

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in union_fields:
                src = None
                if side == 0 and name in batch.column_names:
                    src = batch[name]
                elif side == 1:
                    orig = name[: -len(right_suffix)] if name.endswith(right_suffix) else name
                    if orig in batch.column_names and right_renamed.get(orig) == name:
                        src = batch[orig]
                    elif name == key_col:
                        src = batch[key_col]
                cols[name] = src if src is not None else pa.nulls(n, typ)
            t = pa.table(cols)
            from .window import _hash_partition

            part = _hash_partition(batch[key_col], partitions)
            return t.append_column("part", pa.array(part)).append_column(
                "__side", pa.array(np.full(n, side, np.int8))
            )

        return _t

    both = left_ds.map_batches(_tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(_tag(1), batch_format="pyarrow")
    )

    ts_r = ts_col + right_suffix

    def _asof(group):
        import pandas as pd

        left = group[group["__side"] == 0][left_cols].sort_values(ts_col)
        right = group[group["__side"] == 1][[key_col] + right_cols_u].sort_values(ts_r)
        if len(left) == 0:
            return pd.DataFrame(columns=left_cols + right_cols_u)
        # the union pads each side's missing columns with nulls, which
        # float-ifies the right timestamp dtype in pandas — realign the
        # merge keys (right rows themselves are never null here)
        right = right.assign(**{ts_r: right[ts_r].astype(left[ts_col].dtype)})
        merged = pd.merge_asof(
            left,
            right,
            left_on=ts_col,
            right_on=ts_r,
            by=key_col,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged

    return both.groupby("part").map_groups(_asof, batch_format="pandas")


def interval_join(points_ds, intervals_ds, key_col: str, ts_col: str,
                  start_col: str = "start", end_col: str = "end",
                  partitions: int = 64):
    """Range join: attach to each point the interval (same key) that
    CONTAINS it (``start <= ts <= end``); points outside every interval
    keep nulls. Requires NON-OVERLAPPING intervals per key (e.g. session
    windows) — with overlap, the latest-starting containing interval wins.

    Scale shape: implemented as a backward as-of join on the interval start
    (one co-partitioned shuffle + vectorised ``merge_asof`` per partition
    group) followed by a containment filter — no point-x-interval blowup."""
    # as-of needs the RIGHT ts column named like the left's; feed intervals
    # with start as their timestamp
    iv = intervals_ds.map_batches(
        lambda b: b.rename_columns(
            [ts_col if c == start_col else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    out = asof_join(points_ds, iv, key_col=key_col, ts_col=ts_col, right_suffix="_iv",
                    partitions=partitions)

    end_iv = end_col + "_iv"

    def _contain(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        inside = pc.and_kleene(
            pc.is_valid(batch[end_iv]), pc.less_equal(batch[ts_col], batch[end_iv])
        )
        cols = {}
        for name in batch.column_names:
            if name.endswith("_iv"):
                cols[name] = pc.if_else(inside, batch[name], pa.nulls(batch.num_rows, batch[name].type))
            else:
                cols[name] = batch[name]
        return pa.table(cols)

    return out.map_batches(_contain, batch_format="pyarrow")
