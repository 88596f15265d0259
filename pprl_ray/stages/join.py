"""Distributed equi-joins: broadcast (one small side) and co-partitioned
bucket join (two large sides), plus as-of / interval joins.

The reference's only join is the crosswise θ-join on similarity
(`/root/reference/packages/pprl_service/pprl_service/routers/match.py:54-67`,
broadcast in ``stages/match.py``); equi-joins are an extension a training-
data pipeline needs (dim tables, metadata enrichment, fact-fact joins).

Scale shapes:

- :func:`broadcast_join` — the small side is materialized ONCE into the
  object store (``ray.put``) and every map task joins its batch against the
  shared table zero-copy via ``pyarrow.Table.join`` — no all-to-all exchange
  of the large side. Only per-batch-safe join types are allowed (a right /
  full outer join would re-emit unmatched small-side rows once per batch).
- :func:`bucket_join` — BOTH sides are hash-bucketed by key in one union
  shuffle (equal keys co-locate), then each bucket joins independently with
  a vectorised ``pyarrow.Table.join``. All join types are exact because a
  key's rows from both sides always share a bucket. Shuffle volume is one
  pass over both inputs — the scale-correct fact⋈fact join.
- :func:`asof_join` / :func:`interval_join` — one co-partitioned union
  shuffle + vectorised ``merge_asof`` per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .partitioning import auto_partitions

__all__ = [
    "broadcast_join",
    "bucket_join",
    "asof_join",
    "interval_join",
    "bloom_semi_join",
    "skew_join",
]

# join types that are correct when executed independently per large-side
# batch against the full small side (unmatched SMALL-side rows are never
# emitted, so nothing is duplicated across batches)
_BROADCAST_SAFE = {"inner", "left outer", "left semi", "left anti"}


def broadcast_join(large_ds, small_ds, keys, right_keys=None, join_type: str = "inner",
                   **map_kwargs):
    """Join each batch of ``large_ds`` against the materialized ``small_ds``.

    ``keys``/``right_keys`` follow ``pyarrow.Table.join`` semantics;
    ``join_type`` must be per-batch-safe ("inner" | "left outer" |
    "left semi" | "left anti") — right/full outer joins would emit
    unmatched small-side rows once PER BATCH; use :func:`bucket_join`
    (or swap the sides) for those."""
    import ray

    if join_type not in _BROADCAST_SAFE:
        raise ValueError(
            f"broadcast_join join_type must be one of {sorted(_BROADCAST_SAFE)} "
            f"(got {join_type!r}); right/full outer joins need bucket_join"
        )
    keys = [keys] if isinstance(keys, str) else list(keys)
    if hasattr(small_ds, "to_arrow_refs"):
        # assemble the broadcast table in a WORKER, not through the driver
        # heap: the dataset's blocks are already in the object store, a
        # remote task concatenates them and its return ref is the broadcast
        # handle — the driver never holds a copy
        refs = small_ds.to_arrow_refs()
        ds_schema = small_ds.schema()
        if ds_schema is None:
            raise ValueError(
                "broadcast_join small side has no inferable schema (every "
                "block is empty); anchor it with a zero-row schema-carrying "
                "block (see skew_join._with_schema) or pass a non-empty side"
            )
        schema = ds_schema.base_schema

        def _assemble(*tables):
            # empty blocks can surface with a bare zero-column schema —
            # drop them before concat (they contribute no rows anyway)
            ts = [t for t in tables if t.num_rows > 0]
            return pa.concat_tables(ts).combine_chunks() if ts else schema.empty_table()

        if refs:
            ref = ray.remote(num_cpus=1)(_assemble).remote(*refs)
        else:
            ref = ray.put(schema.empty_table())
    else:
        ref = ray.put(small_ds)

    def _join(batch: pa.Table) -> pa.Table:
        rt = ray.get(ref)  # zero-copy from the local object store
        return batch.join(rt, keys=keys, right_keys=right_keys, join_type=join_type)

    return large_ds.map_batches(_join, batch_format="pyarrow", **map_kwargs)


def _multi_hash_partition(batch: pa.Table, key_cols: list[str], partitions: int) -> np.ndarray:
    """Dtype-agnostic bucket ids over one or more key columns (polars 64-bit
    row hash — deterministic across workers; equal key tuples co-locate)."""
    import polars as pl

    df = pl.DataFrame(
        {c: pl.from_arrow(batch[c].combine_chunks()) for c in key_cols}
    )
    h = df.hash_rows(seed=97).to_numpy()
    return (h % np.uint64(partitions)).astype(np.int32)


def bucket_join(left_ds, right_ds, keys, right_keys=None, join_type: str = "inner",
                partitions: int | None = None, suffix: str = "_r", post=None):
    """Co-partitioned hash join of two LARGE datasets (neither broadcast).

    Both sides are tagged and hash-bucketed by key in ONE union shuffle;
    each bucket then joins independently with ``pyarrow.Table.join`` (all
    pyarrow join types supported, including right/full outer and semi/anti
    — exact because equal keys always share a bucket). Right key columns
    are matched to the left key names; right payload columns that collide
    with left names get ``suffix``.

    Partitioning assumption: per-bucket rows (~input/partitions) fit one
    worker; ``partitions`` defaults to input-size-derived
    (:func:`auto_partitions`) so bucket memory stays flat as inputs grow.
    Skewed hot keys concentrate in one bucket — pre-aggregate or salt
    upstream if a single key's rows exceed a worker.

    ``post``: optional ``pa.Table -> pa.Table`` applied to each bucket's
    joined table INSIDE the bucket task. Because every row of a join key
    lands in exactly one bucket, key-local aggregation in ``post`` (e.g. a
    groupby-sum over the join key) is exact and saves the separate
    all-to-all a downstream reduce would need."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    right_keys = keys if right_keys is None else (
        [right_keys] if isinstance(right_keys, str) else list(right_keys)
    )
    if len(right_keys) != len(keys):
        raise ValueError("right_keys must match keys in length")
    if partitions is None:
        sizes = [s for s in (auto_partitions(left_ds), auto_partitions(right_ds))]
        partitions = max(sizes)

    left_schema = left_ds.schema().base_schema
    right_schema = right_ds.schema().base_schema
    left_cols = list(left_schema.names)
    key_types = {k: left_schema.field(k).type for k in keys}
    rename = dict(zip(right_keys, keys))
    right_payload = [c for c in right_schema.names if c not in right_keys]
    for c in right_payload:
        rename[c] = c + suffix if c in left_schema.names else c
    right_cols_u = [rename[c] for c in right_payload]
    union_fields = [(c, left_schema.field(c).type) for c in left_cols] + [
        (rename[c], right_schema.field(c).type) for c in right_payload
    ]

    def _tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = batch.num_rows
            cols = {}
            for name, typ in union_fields:
                if side == 0:
                    cols[name] = batch[name] if name in batch.column_names else pa.nulls(n, typ)
                else:
                    orig = next((rc for rc, un in rename.items() if un == name), None)
                    if orig is not None and orig in batch.column_names:
                        src = batch[orig]
                        if name in key_types and src.type != key_types[name]:
                            src = pc.cast(src, key_types[name])
                        cols[name] = src
                    else:
                        cols[name] = pa.nulls(n, typ)
            t = pa.table(cols)
            part = _multi_hash_partition(t, keys, partitions)
            return t.append_column("part", pa.array(part)).append_column(
                "__side", pa.array(np.full(n, side, np.int8))
            )

        return _t

    both = left_ds.map_batches(_tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(_tag(1), batch_format="pyarrow")
    )

    def _join_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group["__side"]
        left = group.filter(pc.equal(side, 0)).select(left_cols)
        right = group.filter(pc.equal(side, 1)).select(keys + right_cols_u)
        out = left.join(right, keys=keys, join_type=join_type)
        return post(out) if post is not None else out

    return both.groupby("part").map_groups(_join_bucket, batch_format="pyarrow")


def asof_join(left_ds, right_ds, key_col: str, ts_col: str,
              right_suffix: str = "_r", partitions: int | None = None):
    """As-of (backward) join: for each left row, attach the LATEST right row
    with ``right.ts <= left.ts`` for the same key; left rows without a match
    keep nulls (LEFT ASOF semantics, matching DuckDB ``ASOF LEFT JOIN``).

    Scale shape: both sides are tagged and hash-partitioned by key in ONE
    union shuffle (same-key rows of both sides co-locate, so the as-of
    match within a partition group is exact); per group the work is one
    vectorised ``pandas.merge_asof`` over the partition's sorted rows —
    per-group Python is O(partitions), not O(keys). ``partitions`` defaults
    to input-size-derived (:func:`auto_partitions`).

    Dtype note: groups are received as Arrow and each side is converted to
    pandas SEPARATELY, so the merge keys keep their native dtype (int64
    epoch keys compare exactly — no float64 round-trip above 2^53)."""
    if partitions is None:
        partitions = max(auto_partitions(left_ds), auto_partitions(right_ds))
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
            part = _multi_hash_partition(t, [key_col], partitions)
            return t.append_column("part", pa.array(part)).append_column(
                "__side", pa.array(np.full(n, side, np.int8))
            )

        return _t

    both = left_ds.map_batches(_tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(_tag(1), batch_format="pyarrow")
    )

    ts_r = ts_col + right_suffix

    def _asof(group: pa.Table):
        import pandas as pd
        import pyarrow.compute as pc

        side = group["__side"]
        # convert each side separately: a side's own columns are non-null
        # within its rows, so int64/timestamp dtypes survive the pandas
        # conversion and merge_asof compares exact keys
        left = group.filter(pc.equal(side, 0)).select(left_cols).to_pandas().sort_values(ts_col)
        right = (
            group.filter(pc.equal(side, 1))
            .select([key_col] + right_cols_u)
            .to_pandas()
            .sort_values(ts_r)
        )
        if len(left) == 0:
            return pd.DataFrame(columns=left_cols + right_cols_u)
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

    return both.groupby("part").map_groups(_asof, batch_format="pyarrow")


def interval_join(points_ds, intervals_ds, key_col: str, ts_col: str,
                  start_col: str = "start", end_col: str = "end",
                  partitions: int | None = None):
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


def bloom_semi_join(left_ds, keys_ds, keys, right_keys=None,
                    bloom_bits: int = 1 << 24, bloom_k: int = 4,
                    partitions: int | None = None, exact: bool = True):
    """Semi-join ``left_ds`` to the key set of ``keys_ds`` with a Bloom
    pre-filter: the sketch-driven join optimization for when the key side
    is too large to broadcast EXACTLY but its Bloom filter fits anywhere
    (10 bits/key ≈ 1.2 GB per 10^9 keys vs 8+ GB of raw 64-bit keys).

    Phases: (1) build the Bloom over the key column distributively (tiny
    merge of per-block partials — bytes-OR, exactly order-invariant);
    (2) stream ``left_ds`` through a vectorized ``contains`` filter — NO
    false negatives, ~``fpr`` false positives, so typically >90 % of a
    non-matching corpus never reaches the shuffle; (3) ``exact=True``
    removes the false positives with a co-partitioned semi bucket_join of
    just the SURVIVORS (matches + ~fpr stragglers). ``exact=False`` skips
    phase 3 for pure-filter use (e.g. candidate pruning feeding a verifier
    that re-checks anyway).

    Key typing: a single integer key feeds the Bloom directly (the fast
    path); string keys and composite (multi-column) keys are folded to one
    int64 per row with the same vectorised splitmix64/xxhash combination on
    both sides (:func:`_composite_key_hash`), so the filter works for any
    key shape — the exact phase-3 semi-join always compares the REAL key
    columns, so a (astronomically unlikely) 64-bit fold collision can only
    cost one extra phase-3 row, never a wrong result."""
    import ray

    from ..sketches import BloomSketch
    from ..state.aggregate import SketchPartials, finalize_sketches, merge_blob_rows

    keys = [keys] if isinstance(keys, str) else list(keys)
    right_keys = keys if right_keys is None else (
        [right_keys] if isinstance(right_keys, str) else list(right_keys)
    )
    if len(keys) != len(right_keys):
        raise ValueError("keys and right_keys must have equal length")

    direct = (
        len(keys) == 1
        and pa.types.is_integer(
            dict(zip(keys_ds.schema().names, keys_ds.schema().types))[right_keys[0]]
        )
    )

    if direct:
        partials = keys_ds.map_batches(
            SketchPartials(lambda: BloomSketch(bloom_bits, bloom_k), right_keys[0]),
            batch_format="pyarrow",
        )
    else:
        def _hash_partial(batch: pa.Table) -> pa.Table:
            sk = BloomSketch(bloom_bits, bloom_k)
            sk.update(_composite_key_hash(batch, right_keys))
            import zlib

            return pa.table(
                {
                    "key": pa.array([""], pa.string()),
                    "blob": pa.array([zlib.compress(sk.to_bytes(), 1)], pa.large_binary()),
                    "rows": pa.array([batch.num_rows], pa.int64()),
                }
            )

        partials = keys_ds.map_batches(_hash_partial, batch_format="pyarrow")

    bloom = finalize_sketches(merge_blob_rows(partials, BloomSketch), BloomSketch)[""]
    ref = ray.put(bloom.to_bytes())
    lkeys = keys

    def _prefilter(batch: pa.Table) -> pa.Table:
        sk = BloomSketch.from_bytes(ray.get(ref))
        if direct:
            vals = batch[lkeys[0]].combine_chunks().to_numpy(zero_copy_only=False)
        else:
            vals = _composite_key_hash(batch, lkeys)
        return batch.filter(pa.array(sk.contains(vals)))

    survivors = left_ds.map_batches(_prefilter, batch_format="pyarrow")
    if not exact:
        return survivors
    return bucket_join(
        survivors, keys_ds.select_columns(right_keys), keys=keys,
        right_keys=right_keys, join_type="left semi", partitions=partitions,
    )


def _composite_key_hash(batch: pa.Table, cols) -> np.ndarray:
    """Fold one or more key columns into one int64 per row, vectorised and
    engine-order-independent: integer columns mix through seeded splitmix64,
    string columns through polars' xxhash + splitmix64 finaliser, and the
    running combination re-mixes after each column so (a, b) != (b, a)."""
    import pyarrow.compute as pc

    from ..sketches.hashing import hash_ints, hash_strings, splitmix64

    h = None
    for i, c in enumerate(cols):
        col = batch[c].combine_chunks()
        if pa.types.is_integer(col.type):
            hv = hash_ints(col.to_numpy(zero_copy_only=False), seed=i + 1)
        else:
            import polars as pl

            hv = hash_strings(pl.from_arrow(pc.cast(col, pa.string())), seed=i + 1)
        h = hv if h is None else splitmix64(h ^ hv)
    return h.view(np.int64)


def detect_hot_keys(ds, key_col: str, threshold: float = 0.01,
                    capacity: int = 256) -> set:
    """One streaming Misra-Gries pass over ``key_col``: keys whose
    frequency exceeds ``threshold`` of the rows (MG guarantees every key
    above n/capacity survives, so choose capacity > 1/threshold). Integer
    key columns only (the MG kernel is int64-vectorised)."""
    if capacity < int(1.0 / max(threshold, 1e-9)):
        raise ValueError("capacity must exceed 1/threshold or hot keys can be evicted")
    from ..sketches.heavyhitters import MGSketch

    def _partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        vals = batch[key_col].combine_chunks()
        vc = pl.from_arrow(vals).value_counts()
        ks = vc[:, 0].to_numpy().astype(np.int64)
        cs = vc[:, 1].to_numpy().astype(np.int64)
        sk = MGSketch(capacity)
        sk.update(ks, cs)
        return pa.table(
            {"blob": pa.array([sk.to_bytes()], pa.binary()),
             "n": pa.array([int(cs.sum())], pa.int64())}
        )

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["blob"])  # canonical merge order
    merged, total = None, 0
    from ..sketches.heavyhitters import MGSketch as _MG

    for r in rows:
        sk = _MG.from_bytes(r["blob"])
        merged = sk if merged is None else merged.merge(sk)
        total += r["n"]
    if merged is None or total == 0:
        return set()
    return set(merged.heavy_hitters(threshold).keys())


def skew_join(left_ds, right_ds, keys, right_keys=None, join_type: str = "inner",
              hot_keys=None, hot_threshold: float = 0.01, hot_capacity: int = 256,
              partitions: int | None = None, suffix: str = "_r"):
    """Sketch-driven skew-mitigated equi-join (single integer key).

    A plain hash-bucket join concentrates every row of a hot key in ONE
    bucket — with zipfian keys a single straggler task holds a constant
    fraction of the table while the rest of the cluster idles. This
    operator routes around it:

    1. hot-key detection: a Misra-Gries streaming pass over the LEFT key
       column (:func:`detect_hot_keys`; skipped when ``hot_keys`` is given
       — pass the known-skewed ids at no extra scan),
    2. hot path: left rows with hot keys join against the BROADCAST
       right-side subset for those keys — the heavy rows never shuffle at
       all (the right subset is ≤|hot| keys' worth of rows; for a dim-table
       right side that is ≤|hot| rows),
    3. cold path: everything else takes the ordinary co-partitioned
       :func:`bucket_join`, now free of stragglers.

    Exact for ``inner`` and ``left outer`` (the hot/cold split partitions
    the key space, so no pair is lost or duplicated); other join types
    would emit unmatched right rows from the wrong path — rejected.

    This is the join-side twin of the salted groupby the sketch merges
    use: detect skew with a sketch, then move the SMALL side to the data
    instead of shuffling the hot data to one place."""
    if join_type not in ("inner", "left outer"):
        raise ValueError(
            f"skew_join supports 'inner' and 'left outer' (got {join_type!r}); "
            "unmatched-right-emitting types cannot be split across paths"
        )
    keys = [keys] if isinstance(keys, str) else list(keys)
    right_keys = keys if right_keys is None else (
        [right_keys] if isinstance(right_keys, str) else list(right_keys)
    )
    if len(keys) != 1:
        raise ValueError("skew_join handles a single join key")
    lkey, rkey = keys[0], right_keys[0]

    if hot_keys is None:
        hot_keys = detect_hot_keys(left_ds, lkey, hot_threshold, hot_capacity)
    hot_keys = sorted(int(k) for k in hot_keys)
    if not hot_keys:
        return bucket_join(left_ds, right_ds, keys=lkey, right_keys=rkey,
                           join_type=join_type, partitions=partitions,
                           suffix=suffix)
    hot_arr = pa.array(hot_keys, pa.int64())

    def _split(col):
        def _f(flag):
            def _g(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                m = pc.is_in(pc.cast(batch[col], pa.int64()), value_set=hot_arr)
                return batch.filter(m if flag else pc.invert(m))

            return _g

        return _f

    left_schema = left_ds.schema().base_schema
    right_schema = right_ds.schema().base_schema

    def _with_schema(filtered, schema):
        # a fully-filtered-out side yields only bare empty blocks and loses
        # its schema (Dataset.schema() -> None), which the downstream joins
        # need — anchor every split with one zero-row schema-carrying block
        import ray.data as rd

        return rd.from_arrow(schema.empty_table()).union(filtered)

    left_hot = _with_schema(
        left_ds.map_batches(_split(lkey)(True), batch_format="pyarrow"), left_schema
    )
    left_cold = _with_schema(
        left_ds.map_batches(_split(lkey)(False), batch_format="pyarrow"), left_schema
    )
    right_hot = _with_schema(
        right_ds.map_batches(_split(rkey)(True), batch_format="pyarrow"), right_schema
    )
    right_cold = _with_schema(
        right_ds.map_batches(_split(rkey)(False), batch_format="pyarrow"), right_schema
    )

    # align the hot (broadcast) path with bucket_join's output contract:
    # right key renamed to the left key name, colliding right payload
    # columns renamed with ``suffix`` — otherwise schemas whose non-key
    # columns collide would fail in pyarrow's join as soon as a hot key is
    # detected, making skew_join not a drop-in for bucket_join
    left_names = set(left_schema.names)
    hot_rename = {rkey: lkey}
    for c in right_schema.names:
        if c != rkey:
            hot_rename[c] = c + suffix if c in left_names else c
    lkey_type = left_schema.field(lkey).type

    def _prep_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols, names = [], []
        for c in batch.column_names:
            src = batch[c]
            if c == rkey and src.type != lkey_type:
                src = pc.cast(src, lkey_type)
            cols.append(src)
            names.append(hot_rename.get(c, c))
        return pa.table(dict(zip(names, cols)))

    # re-anchor after the rename map: an all-filtered-out hot side yields
    # only empty blocks whose schema Ray cannot infer, and the post-rename
    # schema is fully known here anyway
    hot_schema = pa.schema(
        [
            pa.field(hot_rename.get(f.name, f.name),
                     lkey_type if f.name == rkey else f.type)
            for f in right_schema
        ]
    )
    right_hot = _with_schema(
        right_hot.map_batches(_prep_right, batch_format="pyarrow"), hot_schema
    )
    hot_joined = broadcast_join(left_hot, right_hot, keys=lkey,
                                join_type=join_type)
    cold_joined = bucket_join(left_cold, right_cold, keys=lkey,
                              right_keys=rkey, join_type=join_type,
                              partitions=partitions, suffix=suffix)
    cold_cols = cold_joined.schema().base_schema.names

    def _align(batch: pa.Table) -> pa.Table:
        return batch.select(cold_cols)

    return cold_joined.union(hot_joined.map_batches(_align, batch_format="pyarrow"))
