"""Sketch-driven range partitioning / distributed sort.

The classic external-sort shape at cluster scale (TeraSort / Spark
RangePartitioner, both public designs): ONE streaming pass builds a KLL
quantile sketch of the sort column (tiny mergeable state instead of the
sample-collect step); its 1/P..(P-1)/P quantiles become P-1 range
boundaries; every row then shuffles ONCE to its range bucket and each
bucket sorts independently. Bucket order = global order, so

- reading ``bucket=000.., bucket=001..`` parquet dirs in name order yields
  a fully globally-sorted dataset (the resumable-sink layout: a crashed
  run re-sorts only missing buckets);
- per-bucket row counts are balanced within the KLL rank-error bound
  (ε ≈ 2/k per side), so no sort task sees more than ~(1/P + 2ε) of the
  data — the skew guarantee ``ds.sort``'s sampled boundaries only give
  probabilistically.

Reference parity: the reference has no sort at all (everything in-memory
row lists); this is the scale-path primitive its pipelines would need
first at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["range_boundaries", "range_bucket", "range_partitioned_sort", "bucket_summaries", "range_sorted_rank", "global_running_sum", "token_budget_pack", "seeded_permutation", "balanced_shards", "negative_samples", "group_quantiles_exact", "weighted_quantiles_exact"]


def range_boundaries(ds, col: str, partitions: int, k: int = 200) -> np.ndarray:
    """P-1 ascending range boundaries from a one-pass KLL sketch of ``col``
    (duplicates collapsed — heavy single values can't split across buckets,
    they just make one bucket larger)."""
    from ..sketches import KLLSketch
    from ..state.aggregate import finalize_sketches, sketch_by_key

    merged = sketch_by_key(ds, lambda: KLLSketch(k), col, None)
    sk = finalize_sketches(merged, KLLSketch)[""]
    bounds = np.array([sk.quantile(i / partitions) for i in range(1, partitions)])
    return np.unique(bounds)


def range_bucket(ds, col: str, boundaries: np.ndarray, bucket_col: str = "bucket"):
    """Tag every row with its range-bucket id (vectorised searchsorted);
    bucket i holds values in (boundaries[i-1], boundaries[i]]."""
    bounds = np.asarray(boundaries)

    def _tag(batch: pa.Table) -> pa.Table:
        v = batch[col].combine_chunks().to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, v, side="left").astype(np.int32)
        return batch.append_column(bucket_col, pa.array(b))

    return ds.map_batches(_tag, batch_format="pyarrow")


def range_partitioned_sort(ds, col: str, partitions: int | None = None,
                           out_dir: str | None = None, k: int = 200):
    """Globally sort ``ds`` by ``col`` via sketch boundaries: one KLL pass,
    one shuffle, per-bucket vectorised sorts. Returns the bucket-tagged,
    per-bucket-sorted Dataset; with ``out_dir`` also writes
    ``bucket=<i>/`` parquet dirs whose name order is global order."""
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    bounds = range_boundaries(ds, col, partitions, k=k)

    def _sort(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(col, kind="mergesort")

    tagged = range_bucket(ds, col, bounds)
    out = tagged.groupby("bucket").map_groups(_sort, batch_format="pandas")
    if out_dir is not None:
        out.write_parquet(out_dir, partition_cols=["bucket"])
    return out


def bucket_summaries(sorted_ds, col: str) -> pd.DataFrame:
    """(bucket, n_rows, min_v, max_v) per range bucket — the cheap global
    proof is in the invariants: buckets are value-disjoint and their union
    is the input (asserted in tests; totals/extremes SQL-oracle-able)."""

    def _summary(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.DataFrame(
            {
                "bucket": pl.from_arrow(batch["bucket"].combine_chunks()),
                "v": pl.from_arrow(batch[col].combine_chunks()),
            }
        )
        g = df.group_by("bucket").agg(
            pl.len().alias("n_rows"), pl.col("v").min().alias("min_v"),
            pl.col("v").max().alias("max_v"),
        )
        return g.to_arrow()

    parts = sorted_ds.map_batches(_summary, batch_format="pyarrow")
    rows = parts.take_all()
    df = pd.DataFrame(rows)
    agg = df.groupby("bucket", as_index=False).agg(
        n_rows=("n_rows", "sum"), min_v=("min_v", "min"), max_v=("max_v", "max")
    )
    return agg.sort_values("bucket").reset_index(drop=True)


def range_sorted_rank(ds, col: str, tiebreak: str, partitions: int | None = None,
                      k: int = 200):
    """Distributed sort that PROVES itself: every row gets its exact global
    rank (1-based, ordered by ``(col, tiebreak)``) computed as
    ``bucket_offset + within-bucket position`` — bucket offsets are the
    cumulative counts of the (tiny) per-bucket histogram, within-bucket
    positions come from the per-bucket vectorised sort. Equal ``col``
    values always share a bucket (searchsorted side='left'), so ranks are
    exact, making the whole distributed sort verifiable row-for-row
    against ``row_number() OVER (ORDER BY col, tiebreak)``."""
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    bounds = range_boundaries(ds, col, partitions, k=k)
    tagged = range_bucket(ds, col, bounds)

    # tiny per-bucket histogram -> exclusive prefix offsets
    def _counts(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
        n = np.bincount(b, minlength=len(bounds) + 1)
        return pa.table(
            {"bucket": pa.array(np.arange(len(n), dtype=np.int32)),
             "n": pa.array(n, pa.int64())}
        )

    hist = tagged.map_batches(_counts, batch_format="pyarrow").take_all()
    counts = np.zeros(len(bounds) + 1, dtype=np.int64)
    for r in hist:
        counts[r["bucket"]] += r["n"]
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def _rank(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        g = group.sort_values([col, tiebreak], kind="mergesort").drop(columns=["bucket"])
        g["rank"] = offsets[b] + np.arange(1, len(g) + 1)
        return g

    return tagged.groupby("bucket").map_groups(_rank, batch_format="pandas")


def global_running_sum(ds, col: str, tiebreak: str, value_col: str,
                       partitions: int | None = None, k: int = 200):
    """Distributed SCAN: exact global rank AND exact running sum of
    ``value_col`` in ``(col, tiebreak)`` order — the ordered-prefix-sum
    primitive (``SUM(v) OVER (ORDER BY col, tiebreak)``).

    Same shape as :func:`range_sorted_rank`: KLL boundaries drive the
    range partitioning, then ONE tiny per-bucket (count, sum) histogram
    gives each bucket its exclusive rank/value offsets, and each bucket's
    vectorised sort + cumsum finishes locally. Two streaming passes over
    the data, one range shuffle; the scan itself is exact (use an integer
    ``value_col`` — fixed-point upstream — for cross-engine bit equality).

    Output: all input columns + ``rank`` (1-based) + ``running_sum``
    (inclusive prefix sum of ``value_col``)."""
    from .partitioning import auto_partitions

    if partitions is None:
        partitions = auto_partitions(ds)
    bounds = range_boundaries(ds, col, partitions, k=k)
    tagged = range_bucket(ds, col, bounds)

    def _hist(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        nb = len(bounds) + 1
        n = np.bincount(b, minlength=nb)
        s = np.zeros(nb, dtype=np.int64)
        np.add.at(s, b, v.astype(np.int64))
        return pa.table(
            {
                "bucket": pa.array(np.arange(nb, dtype=np.int32)),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    counts = np.zeros(len(bounds) + 1, dtype=np.int64)
    vsums = np.zeros(len(bounds) + 1, dtype=np.int64)
    for r in tagged.map_batches(_hist, batch_format="pyarrow").take_all():
        counts[r["bucket"]] += r["n"]
        vsums[r["bucket"]] += r["s"]
    rank_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
    val_off = np.concatenate([[0], np.cumsum(vsums)[:-1]])

    def _scan(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        g = group.sort_values([col, tiebreak], kind="mergesort").drop(columns=["bucket"])
        g["rank"] = rank_off[b] + np.arange(1, len(g) + 1)
        g["running_sum"] = val_off[b] + g[value_col].to_numpy(dtype=np.int64).cumsum()
        return g

    return tagged.groupby("bucket").map_groups(_scan, batch_format="pandas")


def seeded_permutation(ds, id_col: str, seed: int, partitions: int | None = None,
                       pos_col: str = "pos"):
    """Deterministic global training-order shuffle: every row gets a
    pseudo-random but fully reproducible position ``1..N`` — the
    epoch-shuffle primitive of a training-data pipeline (same seed =>
    byte-identical example order on any cluster size, any partitioning,
    any engine; new seed => an independent permutation, no reshuffle of
    the stored corpus needed).

    Mechanics: shuffle key = ``splitmix64(id ^ splitmix64(seed))``
    (:func:`..sketches.hashing.hash_ints` — bijective, so unique ids give
    unique keys), mapped order-preservingly to signed int64; the exact
    global position is then :func:`range_sorted_rank` over the key — one
    KLL boundary pass + ONE range shuffle + per-bucket vectorised sorts.
    No ``random_shuffle`` materialization, no driver-side permutation
    array: state per task is the P-1 boundaries.

    Scale shape: identical to the distributed sort — the hash keys are
    uniform by construction, so KLL range buckets are tight and no bucket
    exceeds ~(1/P + eps) of the corpus regardless of id skew."""
    from ..sketches.hashing import hash_ints

    def _key(batch: pa.Table) -> pa.Table:
        v = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        z = hash_ints(v.astype(np.uint64, copy=False), seed)
        # order-preserving signed view: flip the top bit so unsigned order
        # survives the int64 reinterpretation (KLL/sort work on int64)
        zs = (z ^ np.uint64(1 << 63)).view(np.int64)
        return batch.append_column("_shuffle_key", pa.array(zs, pa.int64()))

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    ranked = range_sorted_rank(keyed, "_shuffle_key", id_col, partitions=partitions)

    def _out(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns(["_shuffle_key"])
        names = [pos_col if c == "rank" else c for c in batch.column_names]
        return batch.rename_columns(names)

    return ranked.map_batches(_out, batch_format="pyarrow")


def balanced_shards(ds, weight_col: str, id_col: str, num_shards: int,
                    partitions: int | None = None, shard_col: str = "shard"):
    """Deterministic weight-balanced sharding: rows are ranked by
    ``(weight DESC, id)`` and dealt round-robin — ``shard = (rank-1) %
    num_shards`` — so every shard receives one row per "round" of the
    ``num_shards`` next-heaviest rows. Consecutive rounds have
    monotonically shrinking weights, so shard totals are balanced to
    within roughly one maximum row weight — the training-shard layout
    (equal token budgets per file) without any bin-packing state.

    The assignment is a pure function of the sorted order
    (``row_number() OVER (ORDER BY weight DESC, id)``), hence reproducible
    on any engine/partitioning and SQL-verifiable row-for-row.

    Scale shape: one KLL pass + one range shuffle (:func:`range_sorted_rank`
    over the negated weight); the shard tag is a vectorised map over the
    ranked stream."""

    def _neg(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_neg_w", pa.array(-w.astype(np.int64, copy=False), pa.int64())
        )

    ranked = range_sorted_rank(
        ds.map_batches(_neg, batch_format="pyarrow"), "_neg_w", id_col,
        partitions=partitions,
    )

    def _tag(batch: pa.Table) -> pa.Table:
        r = batch["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["_neg_w"])
        return batch.append_column(
            shard_col, pa.array((r - 1) % num_shards, pa.int64())
        )

    return ranked.map_batches(_tag, batch_format="pyarrow")


def negative_samples(ds, id_col: str, k: int, seed: int,
                     partitions: int | None = None):
    """Deterministic contrastive negative sampling: each row gets ``k``
    pseudo-random OTHER rows as negatives — the in-batch-negatives /
    contrastive-pair mining step of embedding training, made global and
    reproducible. Negatives are drawn by RING OFFSETS over the id-sorted
    order: row at global position ``p`` pairs with positions
    ``(p - 1 + off_j) mod n + 1`` where ``off_j = 1 + splitmix64(j ^
    splitmix64(seed)) mod (n-1)``. Properties: never self-paired
    (offsets are in [1, n-1]); every row serves as a negative EXACTLY k
    times (each offset is a cyclic shift — a permutation), so no
    popularity bias; fully engine-reproducible (plain modular arithmetic
    over row_number()).

    Scale shape: one :func:`range_sorted_rank` pass for exact positions,
    a k-fold vectorised flat-map of slim ``(id, j, target_pos)`` rows,
    and ONE pair bucket-join back to the position table. No corpus
    payloads move.

    Output: ``(id_col, j, neg_<id_col>)`` — k rows per input row."""
    from ..sketches.hashing import splitmix64
    from .join import bucket_join

    n = ds.count()
    if n < 2:
        raise ValueError("need at least 2 rows to sample negatives")
    mixed = int(splitmix64(np.array([seed], dtype=np.uint64))[0])
    offs = [
        1 + int(splitmix64(np.array([j ^ mixed], dtype=np.uint64))[0]) % (n - 1)
        for j in range(k)
    ]

    def _copy_id(batch: pa.Table) -> pa.Table:
        return batch.append_column("_tb", batch[id_col])

    ranked = range_sorted_rank(
        ds.map_batches(_copy_id, batch_format="pyarrow"), id_col, "_tb",
        partitions=partitions,
    ).map_batches(
        lambda b: pa.table({id_col: b[id_col], "rank": b["rank"]}),
        batch_format="pyarrow",
    ).materialize()

    offs_arr = np.array(offs, dtype=np.int64)

    def _targets(batch: pa.Table) -> pa.Table:
        r = batch["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch[id_col].combine_chunks()
        rep = np.repeat(np.arange(len(r)), k)
        j = np.tile(np.arange(k, dtype=np.int64), len(r))
        tpos = (r[rep] - 1 + offs_arr[j]) % n + 1
        return pa.table(
            {
                id_col: ids.take(pa.array(rep)),
                "j": pa.array(j, pa.int64()),
                "tpos": pa.array(tpos, pa.int64()),
            }
        )

    targets = ranked.map_batches(_targets, batch_format="pyarrow")
    lookup = ranked.map_batches(
        lambda b: pa.table({"tpos": b["rank"], f"neg_{id_col}": b[id_col]}),
        batch_format="pyarrow",
    )
    joined = bucket_join(targets, lookup, keys="tpos", partitions=partitions)
    return joined.map_batches(
        lambda b: b.select([id_col, "j", f"neg_{id_col}"]), batch_format="pyarrow"
    )


def group_quantiles_exact(ds, key_col: str, val_col: str, qs,
                          partitions: int | None = None):
    """EXACT per-group quantiles (``percentile_disc`` semantics: the
    element at 1-based position ``ceil(q * n)`` of the group's sorted
    values) — the exact companion to the KLL per-key sketch quantiles
    (`kll_by_source`): use this when groups fit a worker, the sketch when
    a single group outgrows one.

    Scale shape: ONE hash-by-key shuffle co-locates each group (classic
    exact-quantile requirement), then each partition does a single
    vectorised pass: sort by (key, value), per-group offsets, fancy-index
    the ceil(q*n) positions. Per-group Python overhead is O(partitions).

    Output: one row per key — ``(key_col, q_<q> ...)`` columns."""
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)
    qs = list(qs)
    names = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def _part(batch: pa.Table) -> pa.Table:
        import polars as pl

        h = pl.from_arrow(batch[key_col].combine_chunks()).hash(seed=29).to_numpy()
        return batch.append_column(
            "part", pa.array((h % np.uint64(partitions)).astype(np.int32))
        )

    def _quant(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, val_col], kind="mergesort")
        v = g[val_col].to_numpy()
        keys, starts = np.unique(g[key_col].to_numpy(), return_index=True)
        sizes = np.diff(np.append(starts, len(g)))
        out = {key_col: keys}
        for q, name in zip(qs, names):
            # ceil(q*n) as exact integer arithmetic for float-safe cuts
            pos = starts + np.minimum(
                np.ceil(q * sizes).astype(np.int64) - 1, sizes - 1
            ).clip(0)
            out[name] = v[pos]
        return pd.DataFrame(out)

    return (
        ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_quant, batch_format="pandas")
    )


def token_budget_pack(ds, value_col: str, order_col: str, tiebreak: str,
                      budget: int, partitions: int | None = None):
    """Pack rows into fixed-budget bins in a deterministic global order —
    the training-batch sequence-packing shape (shard a corpus into
    ~``budget``-token chunks). A row's bin is
    ``(running_sum - value) // budget`` over the exact global scan, so
    every bin holds consecutive rows and ends at the first row crossing
    the budget; bins are reproducible on any engine (plain window SQL),
    any partitioning, any load. Rows with ``value > budget`` still get a
    bin (they overflow it alone — split upstream if that matters)."""
    scanned = global_running_sum(ds, order_col, tiebreak, value_col, partitions)

    def _bins(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        run = batch["running_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        val = batch[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bin_id", pa.array((run - val) // budget, pa.int64())
        )

    return scanned.map_batches(_bins, batch_format="pyarrow")


def weighted_quantiles_exact(ds, val_col: str, weight_col: str, tiebreak: str,
                             qs, partitions: int | None = None):
    """EXACT weighted quantiles (lower / disc semantics): for each rational
    q = num/den, the smallest value whose inclusive cumulative weight
    reaches ``ceil(q * W)`` in ``(val, tiebreak)`` order — the
    token-weighted median/percentile every corpus-stats report wants
    (weighting docs by token count instead of counting each doc once).

    Built on :func:`global_running_sum` (KLL-driven range partitioning +
    exact bucket offsets): one range shuffle, then each bucket emits at
    most one candidate row per quantile (its minimal-rank row whose
    running weight crosses the threshold) and a tiny fold picks the
    global minimum — no full sorted materialisation, no second shuffle.
    Integer weights keep every comparison big-int exact (SQL-replicable).

    ``qs``: iterable of (num, den) rationals, e.g. ((1,4),(1,2),(3,4)).
    Returns one row per quantile: ``(q_num, q_den, value, cum_weight,
    rank)``."""
    qs = [(int(n), int(d)) for n, d in qs]
    running = global_running_sum(ds, val_col, tiebreak, weight_col,
                                 partitions=partitions)
    total = int(ds.sum(weight_col))
    thresholds = [(n, d, (n * total + d - 1) // d) for n, d in qs]

    def _cand(batch: pa.Table) -> pa.Table:
        rs = batch["running_sum"].combine_chunks().to_numpy(zero_copy_only=False)
        rk = batch["rank"].combine_chunks().to_numpy(zero_copy_only=False)
        v = batch[val_col].combine_chunks().to_numpy(zero_copy_only=False)
        rows = {"q_num": [], "q_den": [], "value": [], "cum_weight": [],
                "rank": []}
        for n, d, t in thresholds:
            hit = np.flatnonzero(rs >= t)
            if len(hit):
                j = hit[np.argmin(rk[hit])]
                rows["q_num"].append(n)
                rows["q_den"].append(d)
                rows["value"].append(int(v[j]))
                rows["cum_weight"].append(int(rs[j]))
                rows["rank"].append(int(rk[j]))
        return pa.table({
            "q_num": pa.array(rows["q_num"], pa.int64()),
            "q_den": pa.array(rows["q_den"], pa.int64()),
            "value": pa.array(rows["value"], pa.int64()),
            "cum_weight": pa.array(rows["cum_weight"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
        })

    def _fold(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = (df.sort_values("rank", kind="stable")
               .groupby(["q_num", "q_den"], sort=True).first().reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    return (running.map_batches(_cand, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_fold, batch_size=None, batch_format="pyarrow"))
