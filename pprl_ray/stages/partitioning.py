"""Scale-aware partition-count derivation for partitioned-vectorized
operators (co-partitioned joins, windowed aggregates, dedup).

Fixed partition counts are the classic scale bug: each ``map_groups``
partition group materializes as ONE in-memory frame, so ``input_bytes /
partitions`` must stay bounded (~``target_bytes``) as inputs grow 1000x.
``auto_partitions`` derives the count from dataset metadata when that is
free (pure read plans / materialized datasets expose size without
execution) and falls back to a caller hint or default otherwise — it NEVER
triggers execution of a lazy pipeline just to size partitions.
"""

from __future__ import annotations

import math

__all__ = [
    "auto_partitions",
    "free_size_bytes",
    "free_num_rows",
    "compact_blocks",
    "read_parquet_sized",
]

# ~128 MiB of input rows per partition group: large enough that per-group
# Python overhead (~0.5 ms) is noise, small enough that a group's pandas
# frame fits a worker heap with room for the merge/sort temporaries.
TARGET_PARTITION_BYTES = 128 << 20


def free_num_rows(ds) -> int | None:
    """Row count IF knowable without execution (parquet metadata / pure
    read plans / materialized datasets), else None."""
    try:
        return ds._logical_plan.dag.infer_metadata().num_rows
    except Exception:
        return None


def free_size_bytes(ds) -> int | None:
    """Dataset size in bytes IF knowable without execution, else None.

    Pure read plans carry parquet-metadata estimates; materialized /
    executed plans carry exact block metadata. Lazy transformed plans
    return None (``Dataset.size_bytes()`` would execute them — never do
    that here)."""
    try:
        return ds._logical_plan.dag.infer_metadata().size_bytes
    except Exception:
        return None


def auto_partitions(
    ds=None,
    *,
    size_bytes: int | None = None,
    target_bytes: int = TARGET_PARTITION_BYTES,
    default: int = 64,
    lo: int = 8,
    hi: int = 1 << 20,
) -> int:
    """Partition count targeting ``target_bytes`` of input per partition.

    Resolution order: explicit ``size_bytes`` hint > free dataset metadata
    (:func:`free_size_bytes`) > ``default``. Clamped to [lo, hi]."""
    if size_bytes is None and ds is not None:
        size_bytes = free_size_bytes(ds)
    if size_bytes is None:
        return default
    return int(min(hi, max(lo, math.ceil(size_bytes / target_bytes))))


def compact_blocks(mat_ds, target_bytes: int = 64 << 20, min_blocks: int = 8):
    """Bound a MATERIALIZED dataset's block count to ~target_bytes blocks
    (floor ``min_blocks`` for parallelism). Ray's shuffle operators pay
    per-block scheduling overhead on BOTH sides — an all-to-all over
    hundreds of tiny blocks spends seconds on task dispatch for millis of
    compute, and iterative operators multiply tiny blocks across rounds.
    No-op when the block count is already reasonable."""
    size = mat_ds.size_bytes() or 0
    nb = max(min_blocks, math.ceil(size / target_bytes))
    if mat_ds.num_blocks() > 2 * nb:
        return mat_ds.repartition(nb).materialize()
    return mat_ds


def read_parquet_sized(
    path, columns=None, target_bytes: int = 32 << 20, lo: int = 16, **kwargs
):
    """``ray.data.read_parquet`` with the block count pinned from the
    file's OWN metadata (~``target_bytes`` per block, floor ``lo``) instead
    of the cluster's default parallelism heuristic.

    Ray's default oversplits small files (64 tiny blocks for a 14 MB
    table); any downstream shuffle then pays per-block dispatch on every
    one of them — seconds of scheduling for millis of compute. Pinning by
    size keeps the count input-proportional (so it still grows to
    thousands of blocks at 100 TB) and makes topology-sensitive merges
    reproducible across num_cpus.

    Pass ``filter=`` (a ``pyarrow.dataset`` expression) to push a row
    predicate INTO the scan: row groups whose column statistics exclude the
    predicate are skipped entirely and surviving rows are filtered before a
    block is ever materialized — at 100 TB a selective predicate then costs
    a metadata pass plus the matching row groups, not a full read. The
    block count stays pinned from the UNfiltered size (cheap metadata; a
    too-high count only yields some empty blocks)."""
    import ray.data as rd

    size = free_size_bytes(rd.read_parquet(path, columns=columns))
    if size is not None:
        kwargs.setdefault(
            "override_num_blocks",
            auto_partitions(size_bytes=size, target_bytes=target_bytes, lo=lo),
        )
    return rd.read_parquet(path, columns=columns, **kwargs)
