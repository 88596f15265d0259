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

__all__ = [
    "sessionize",
    "running_aggregate",
    "rolling_aggregate",
    "hop_windows",
    "latest_by_key",
    "decayed_sum",
    "funnel_counts",
    "cohort_retention",
]


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


def running_aggregate(ds, key_col: str, order_cols, val_col: str,
                      partitions: int | None = None):
    """Per-key running aggregate (cumulative sum + 1-based row number) —
    the ``SUM(...) OVER (PARTITION BY key ORDER BY ...)`` window operator.

    Scale shape: identical to :func:`sessionize` — ONE hash-by-key shuffle
    co-locates each key's rows (exact: a key never spans partitions), then
    each partition group does a single vectorised pandas pass
    (sort + groupby.cumsum/cumcount), so per-group Python overhead is
    O(partitions), not O(keys). The input never materializes; skewed hot
    keys concentrate in one bucket — salt upstream if one key's rows
    exceed a worker.

    ``order_cols`` must totally order rows within a key (include a unique
    tie-break column) or the running prefix is not well-defined. For an
    exact distributed sum use an integer ``val_col`` (the callers convert
    floats to fixed-point micro-units first).

    Output: all input columns + ``running_sum`` (cumulative ``val_col``)
    + ``row_in_key`` (1-based rank within the key).

    Reference parity: none (the reference has no windowed/ordered
    semantics, SURVEY.md §2.8) — this is part of the windowed-aggregate
    extension surface."""
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)

    def _part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pa.array(_hash_partition(batch[key_col], partitions))
        )

    parted = ds.map_batches(_part, batch_format="pyarrow")

    def _running(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, *order_cols], kind="mergesort").reset_index(drop=True)
        grp = g.groupby(key_col, sort=False)
        g["running_sum"] = grp[val_col].cumsum()
        g["row_in_key"] = grp.cumcount() + 1
        return g.drop(columns=["part"])

    return parted.groupby("part").map_groups(_running, batch_format="pandas")


def rolling_aggregate(ds, key_col: str, order_cols, val_col: str,
                      window: int, partitions: int | None = None):
    """Per-key ROLLING aggregate over the last ``window`` rows — the
    ``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)`` operator (moving averages / trailing
    feature windows over an event stream).

    Scale shape: identical to :func:`running_aggregate` — ONE hash-by-key
    shuffle co-locates each key's rows, then each partition group runs a
    single vectorised pass: per-key integer cumsum, a per-key ``shift`` by
    ``window``, and a subtraction. Per-group Python overhead is
    O(partitions), not O(keys); no key ever needs more memory than its own
    rows. Use an integer ``val_col`` (fixed-point upstream) for an exact,
    engine-independent result.

    Output: all input columns + ``rolling_sum`` (sum of the last
    ``window`` values incl. current) + ``n_in_window`` (how many rows the
    window actually holds — < ``window`` near the key's start).

    Reference parity: none (no windowed semantics in the reference,
    SURVEY.md §2.8) — windowed-aggregate extension surface."""
    if window < 1:
        raise ValueError("window must be >= 1")
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)

    def _part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pa.array(_hash_partition(batch[key_col], partitions))
        )

    parted = ds.map_batches(_part, batch_format="pyarrow")

    def _roll(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, *order_cols], kind="mergesort").reset_index(drop=True)
        grp = g.groupby(key_col, sort=False)
        cs = grp[val_col].cumsum().to_numpy(dtype=np.int64)
        # cumsum lagged by `window` WITHIN each key (0 before the key has
        # `window` rows); NaN fill keeps exactness — cumsums here stay far
        # below 2**53 per key, and we cast straight back to int64
        g["_cs"] = cs
        lag = grp["_cs"].shift(window)
        lag_i = np.where(np.isnan(lag.to_numpy(dtype=np.float64)), 0,
                         lag.to_numpy(dtype=np.float64)).astype(np.int64)
        row_in_key = (grp.cumcount() + 1).to_numpy(dtype=np.int64)
        g["rolling_sum"] = cs - lag_i
        g["n_in_window"] = np.minimum(row_in_key, window)
        return g.drop(columns=["part", "_cs"])

    return parted.groupby("part").map_groups(_roll, batch_format="pandas")


def hop_windows(ds, ts_col: str, length_s: int, step_s: int, cols=None):
    """Assign every row to ALL hopping (sliding) windows covering it:
    windows start at multiples of ``step_s`` and span ``length_s`` seconds,
    so each row lands in ``length_s // step_s`` windows (``step_s`` must
    divide ``length_s``). Emits one output row per (input row, window) with
    a ``window_start`` epoch-seconds column — a vectorised flat-map (numpy
    repeat), no shuffle; the caller aggregates by (window_start, ...) the
    same way as a tumbling window.

    Scale note: output is a constant ``length_s/step_s``× the input —
    choose the ratio, not the data, to bound the blow-up. Tumbling windows
    are the ``length_s == step_s`` special case (factor 1)."""
    if length_s % step_s != 0 or length_s <= 0 or step_s <= 0:
        raise ValueError("step_s must divide length_s and both must be positive")
    nwin = length_s // step_s
    cols = list(cols) if cols is not None else None

    def _expand(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.select(cols) if cols is not None else batch
        # epoch seconds (timestamp[us] -> int64 us -> s, floor for >=1970)
        t = pc.cast(pc.cast(batch[ts_col], pa.int64()), pa.int64()).to_numpy(
            zero_copy_only=False
        ) // 1_000_000
        # window m covers t iff m*step <= t < m*step + length; with
        # step | length every m in [t//step - nwin + 1, t//step] qualifies
        m_max = t // step_s
        idx = np.repeat(np.arange(len(t)), nwin)
        offs = np.tile(np.arange(nwin, dtype=np.int64), len(t))
        starts = (m_max[idx] - offs) * step_s
        out = keep.take(pa.array(idx))
        return out.append_column("window_start", pa.array(starts, pa.int64()))

    return ds.map_batches(_expand, batch_format="pyarrow")


def latest_by_key(ds, key_col: str, order_cols, partitions: int | None = None,
                  keep: str = "max"):
    """SCD-style compaction: ONE row per key — the lexicographic maximum by
    ``order_cols`` (e.g. ``["ts", "event_id"]``; make the last column a
    tie-breaking unique id for a deterministic winner). The changelog ->
    current-state operator every incremental ingest pipeline ends with.
    ``keep="min"`` flips the winner to the lexicographic MINIMUM — the
    first-occurrence-wins form (streaming/windowed event dedup: first event
    per key wins, later replays drop).

    Scale shape: a per-batch combiner keeps each key's local winner FIRST
    (one vectorised sort + drop_duplicates per batch), so only ~one row per
    (key, batch) enters the single hash(key) shuffle; the per-partition
    reduce repeats the same vectorised pass. No key ever needs more rows
    co-resident than it has batches touching it — flat memory at any
    corpus size, and skewed hot keys cost shuffle rows proportional to
    batch count, not row count."""
    from .partitioning import auto_partitions

    if keep not in ("max", "min"):
        raise ValueError(f"keep must be 'max' or 'min', got {keep!r}")
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    if partitions is None:
        partitions = auto_partitions(ds)
    by = [key_col] + order_cols
    asc = [True] + [keep == "min"] * len(order_cols)

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=asc, kind="stable").drop_duplicates(
            key_col
        )

    def _partial(batch: pa.Table) -> pa.Table:
        out = pa.Table.from_pandas(
            _local(batch.to_pandas()), preserve_index=False
        ).cast(batch.schema)
        return out.append_column(
            "__part", pa.array(_hash_partition(out[key_col], partitions))
        )

    def _reduce(group: pd.DataFrame) -> pd.DataFrame:
        return _local(group).drop(columns="__part")

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_reduce, batch_format="pandas")
    )


def funnel_counts(ds, key_col: str, ts_col: str, type_col: str, steps,
                  partitions: int | None = None):
    """Ordered funnel analysis: for each prefix of ``steps``, how many
    keys completed it IN ORDER — step i is matched by the key's EARLIEST
    event of that type with a timestamp STRICTLY after its step i-1 match
    (the standard product-analytics funnel; unordered completions don't
    count).

    Scale shape: ONE hash-by-key shuffle co-locates each key's events
    (only rows of the step types move — pre-filtered); each partition
    runs ``len(steps)`` vectorised passes (per-key min of qualifying
    timestamps), emitting just ``len(steps)`` partial counts; a tiny
    step-keyed fold finishes. Output: ``(step, step_type, n_keys)``."""
    steps = list(steps)
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)

    stepset = set(steps)

    def _part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch[type_col],
                        value_set=pa.array(sorted(stepset)))
        batch = batch.filter(mask)
        return batch.append_column(
            "part", pa.array(_hash_partition(batch[key_col], partitions))
        )

    parted = ds.map_batches(_part, batch_format="pyarrow")

    def _funnel(group: pd.DataFrame) -> pd.DataFrame:
        counts = []
        cur = None  # per-key completion time of the previous step
        for s in steps:
            sub = group[group[type_col] == s]
            if cur is not None:
                sub = sub.merge(cur.rename("prev"), left_on=key_col,
                                right_index=True)
                sub = sub[sub[ts_col] > sub["prev"]]
            cur = sub.groupby(key_col)[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame(
            {"step": np.arange(1, len(steps) + 1, dtype=np.int64),
             "step_type": steps, "n_keys": np.array(counts, np.int64)}
        )

    partials = parted.groupby("part").map_groups(_funnel, batch_format="pandas")

    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "step": [int(group["step"].iloc[0])],
                "step_type": [group["step_type"].iloc[0]],
                "n_keys": [int(group["n_keys"].sum())],
            }
        )

    return partials.groupby("step").map_groups(_fold, batch_format="pandas")


def cohort_retention(ds, key_col: str, ts_col: str, max_offset: int = 7,
                     partitions: int | None = None):
    """Cohort retention table: keys are cohorted by their FIRST active
    day; for each (cohort_day, day_offset ≤ max_offset) the number of
    cohort keys active that day — the classic growth-analytics triangle.
    Days are epoch days (``us // 86_400_000_000``), engine-reproducible.

    Scale shape: ONE hash-by-key shuffle (slim ``(key, day)`` rows,
    per-batch deduped); each partition computes per-key cohorts and
    distinct active days vectorised and emits partial ``(cohort_day,
    day_offset, count)`` rows; a tiny pair-keyed fold finishes."""
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)

    def _days(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        day = pc.divide(us, 86_400_000_000)
        t = pa.table({key_col: batch[key_col], "day": day})
        import polars as pl

        df = pl.from_arrow(t).unique()
        out = df.to_arrow()
        return out.append_column(
            "part", pa.array(_hash_partition(out[key_col], partitions))
        )

    parted = ds.map_batches(_days, batch_format="pyarrow")

    def _cohort(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates([key_col, "day"])
        cohort = g.groupby(key_col)["day"].transform("min")
        off = g["day"] - cohort
        keep = off <= max_offset
        out = pd.DataFrame({"cohort_day": cohort[keep], "day_offset": off[keep]})
        agg = out.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return agg.rename(columns={"size": "n_active"})

    partials = parted.groupby("part").map_groups(_cohort, batch_format="pandas")

    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cohort_day": [int(group["cohort_day"].iloc[0])],
                "day_offset": [int(group["day_offset"].iloc[0])],
                "n_active": [int(group["n_active"].sum())],
            }
        )

    def _pair(batch: pa.Table) -> pa.Table:
        key = pa.array(
            batch["cohort_day"].to_numpy(zero_copy_only=False) * 1000
            + batch["day_offset"].to_numpy(zero_copy_only=False),
            pa.int64(),
        )
        return batch.append_column("pairkey", key)

    return (
        partials.map_batches(_pair, batch_format="pyarrow")
        .groupby("pairkey")
        .map_groups(_fold, batch_format="pandas")
    )


def decayed_sum(ds, key_col: str, ts_col: str, val_col: str,
                horizon_us: int, half_life_days: int = 1,
                max_days: int = 64):
    """Exponentially-decayed (time-weighted) sum per key: each event
    contributes ``value * 0.5 ** (age_days / half_life_days)`` where
    ``age_days = (horizon_us - ts_us) // 86400_000_000`` — the classic
    recency-weighted aggregate of feature stores / trending metrics,
    computed EXACTLY.

    Exact-arithmetic design (no float pow, no summation-order hazard):
    values are quantised to integer micro-units, ages to whole half-life
    periods; the streaming pass reduces per ``(key, age)`` integer sums
    (mergeable, at most ``max_days`` ages per key ever held), and the
    closing fold computes ``sum_u(key, d) * 2**(max_days - d)`` in exact
    big-int arithmetic — ``2**-d`` is exactly representable, so the final
    ``/ 2**max_days / 1e6`` float readout is bit-reproducible on any
    engine (replicated in SQL via a HUGEINT powers CTE).

    Scale shape: the only exchange is the tiny ``(key, age, sum)`` table —
    ``keys × max_days`` rows regardless of corpus size. Events older than
    ``max_days`` half-lives are clamped to the oldest age (weight already
    ~5e-20 at the default 64)."""
    import pyarrow.compute as pc

    day_us = 86_400_000_000 * int(half_life_days)

    def _partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.timestamp("us")).cast(pa.int64()).to_numpy()
        age = np.minimum((int(horizon_us) - us) // day_us, max_days - 1)
        if age.min() < 0:
            raise ValueError("event timestamp after the horizon")
        vu = (
            pc.cast(pc.round(pc.multiply(batch[val_col], 1_000_000)), pa.int64())
            .to_numpy()
        )
        keys = batch[key_col].combine_chunks().dictionary_encode()
        codes = keys.indices.to_numpy(zero_copy_only=False)
        uniques = np.array([str(u) for u in keys.dictionary.to_pylist()], dtype=object)
        pair = codes.astype(np.int64) * max_days + age
        up, inv = np.unique(pair, return_inverse=True)
        sums = np.zeros(len(up), dtype=np.int64)
        np.add.at(sums, inv, vu)
        return pa.table(
            {
                key_col: pa.array(uniques[up // max_days], pa.string()),
                "age": pa.array(up % max_days, pa.int64()),
                "sum_u": pa.array(sums, pa.int64()),
            }
        )

    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        total = 0
        for age, s in zip(group["age"].tolist(), group["sum_u"].tolist()):
            total += int(s) << (max_days - int(age))
        value = float(total) / float(1 << max_days) / 1e6
        return pd.DataFrame({key_col: [group[key_col].iloc[0]],
                             "decayed_value": [value]})

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(_fold, batch_format="pandas")
    )


def event_transitions(ds, key_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", order_break=None,
                      partitions: int | None = None):
    """Per-key ordered transition counts — the Markov-chain matrix of a
    clickstream: for every key's event sequence ordered by
    ``(ts, order_break)``, count each adjacent ``(from_type, to_type)``
    pair across the whole corpus (the product-analytics "what happens
    after X" readout; row-normalising the output gives the first-order
    Markov transition probabilities).

    ``order_break`` (default none) is a tie-break column making the order
    total — pass the event id so the result is deterministic when
    timestamps collide, and use the same tie-break in any replica.

    Scale shape: ONE hash-by-key shuffle of slim (key, ts, type[, brk])
    rows co-locates each key's events; each partition does one vectorised
    lexsort + shift to emit adjacent pairs, pre-reduced to per-partition
    (from, to, n) partials; a tiny pair-keyed fold finishes. Output:
    ``(from_type, to_type, n)``."""
    import polars as pl

    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)
    nparts = int(partitions)

    def _part(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col], ts_col: batch[ts_col],
                type_col: batch[type_col]}
        if order_break is not None:
            cols[order_break] = batch[order_break]
        out = pa.table(cols)
        return out.append_column(
            "part", pa.array(_hash_partition(batch[key_col], nparts))
        )

    parted = ds.map_batches(_part, batch_format="pyarrow")

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        keys = group[key_col].to_numpy()
        ts = group[ts_col].to_numpy()
        brk = (group[order_break].to_numpy() if order_break is not None
               else np.zeros(len(group), dtype=np.int64))
        order = np.lexsort((brk, ts, keys))
        k = keys[order]
        t = group[type_col].to_numpy()[order]
        if len(k) < 2:
            return pd.DataFrame({"from_type": [], "to_type": [], "n": []}).astype(
                {"from_type": "object", "to_type": "object", "n": "int64"})
        same = k[1:] == k[:-1]
        out = (
            pl.DataFrame({"from_type": t[:-1][same], "to_type": t[1:][same]})
            .group_by(["from_type", "to_type"]).agg(pl.len().alias("n"))
        )
        return pd.DataFrame({
            "from_type": out["from_type"].to_list(),
            "to_type": out["to_type"].to_list(),
            "n": out["n"].to_numpy().astype(np.int64),
        })

    partials = parted.groupby("part").map_groups(_pairs, batch_format="pandas")

    def _fold_part(batch: pa.Table) -> pa.Table:
        import zlib

        h = np.array(
            [zlib.crc32(f"{a}\x00{b}".encode()) % nparts
             for a, b in zip(batch["from_type"].to_pylist(),
                             batch["to_type"].to_pylist())],
            dtype=np.int32,
        )
        return batch.append_column("fpart", pa.array(h))

    def _sum(group: pd.DataFrame) -> pd.DataFrame:
        return (group.groupby(["from_type", "to_type"], sort=False)["n"]
                .sum().reset_index())

    return (
        partials.map_batches(_fold_part, batch_format="pyarrow")
        .groupby("fpart").map_groups(_sum, batch_format="pandas")
    )
