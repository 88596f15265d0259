"""Deterministic distributed sampling operators.

``weighted_sample_es``: weighted random sampling without replacement via
the Efraimidis–Spirakis A-ES scheme (public: Efraimidis & Spirakis 2006,
"Weighted random sampling with a reservoir"): each row gets key
``u^(1/w)`` for uniform ``u`` and weight ``w``; the sample is the k rows
with the LARGEST keys. The keys of a top-k set form a mergeable sketch —
partial top-k per batch, tiny associative reduce — so the sample is exact,
single-pass, and needs no shuffle of the data itself.

Determinism: ``u`` is derived from the row id's md5 (the same
content-hash primitive as ``hash_sample``/``source_mix``), not an RNG —
the sample is reproducible across runs, partitionings and engines, and
each selection is replicable in stock SQL (``ln(u)/w`` is the monotone
log form of ``u^(1/w)``, computed identically in numpy and DuckDB libm).

Scale shape: per-batch partial top-k (k rows each) -> driver merge of
O(num_blocks * k) candidate rows. For k small (samples, spot-checks,
eval splits) this is the cheapest possible plan: one streaming pass,
nothing materializes. For sample sizes that are a FRACTION of the corpus
use the Bernoulli ``hash_sample`` / per-source ``source_mix`` rate
samplers instead — top-k selection is the wrong tool there.

Reference parity: none (the reference's only sampling is seeded-RNG bit
sampling inside RBF, SURVEY.md §2.7); this is part of the training-data
pipeline extension surface (deterministic data mixing / subset selection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.digest import md5_bucket32

__all__ = [
    "weighted_sample_es",
    "hash_split",
    "temperature_mix",
    "cap_per_group",
    "stratified_split_exact",
]

_U_DENOM = float(1 << 32)


def _es_keys(ids, weights: np.ndarray) -> np.ndarray:
    """ln(u)/w for u = (md5_32(id)+1)/2^32 in (0,1] — monotone in u^(1/w)."""
    h = md5_bucket32(ids, 1 << 32).astype(np.float64)
    u = (h + 1.0) / _U_DENOM
    if np.any(weights <= 0):
        raise ValueError("weights must be positive")
    return np.log(u) / weights


def _canon_top(key: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k candidates in the SAME canonical
    (key desc, id asc) order the driver merge uses — a reversed stable
    argsort would order equal keys by descending position, dropping the
    canonically-kept row at a batch's k-boundary and making the sample
    partitioning-dependent despite the determinism contract."""
    return np.lexsort((ids, -key))[:k]


def weighted_sample_es(ds, id_col: str, weight_col: str, k: int):
    """k-row weighted sample without replacement (probability ∝ weight).

    Returns a pandas DataFrame of the selected input rows (all columns,
    sorted by ``id_col``) — k is expected small; the candidate set the
    driver merges is ``O(num_blocks * k)`` rows regardless of input size.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        key = _es_keys(batch[id_col].combine_chunks(), w.astype(np.float64))
        take = _canon_top(key, ids, k)
        out = batch.take(pa.array(take))
        return out.append_column("_es_key", pa.array(key[take]))

    def _rereduce(batch: pa.Table) -> pa.Table:
        key = batch["_es_key"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        take = _canon_top(key, ids, k)
        return batch.take(pa.array(take))

    # combiner pass over the bundled per-block partials: the driver then
    # merges O(bundles * k), not O(num_blocks * k), candidates — at 100 TB
    # the per-block partials alone would be millions of rows
    cand = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .map_batches(_rereduce, batch_format="pyarrow", batch_size=8192)
        .take_all()
    )
    # canonical order (key desc, id asc) -> deterministic regardless of
    # block arrival order; ids are unique so the order is total
    cand.sort(key=lambda r: (-r["_es_key"], r[id_col]))
    top = cand[:k]
    top.sort(key=lambda r: r[id_col])
    df = pd.DataFrame(top)
    return df.drop(columns=["_es_key"])


def cap_per_group(ds, group_col: str, id_col: str, k: int):
    """Per-group cap ("domain balancing", the CommonCrawl-pipeline step
    that stops one domain/source dominating a training mix): keep AT MOST
    ``k`` rows per group, selected as the k SMALLEST ``splitmix64(id)``
    keys — a uniform without-replacement sample within each group,
    deterministic across runs, partitionings and cluster sizes (splitmix64
    is bijective on the unique int ids, so the order is total and needs no
    tie-break).

    Scale shape: per-batch partial keeps ≤k per group (vectorised lexsort
    + run-length cut, no Python loop), a bundled combiner pass shrinks the
    candidate stream, and a tiny ``groupby(group).map_groups`` reduce —
    over O(bundles · k) rows PER GROUP, never the corpus — picks the
    global k. The full dataset streams through exactly once and is never
    shuffled; only candidates move. Replicable in SQL as
    ``row_number() OVER (PARTITION BY group ORDER BY splitmix64(id))``.
    """
    from ..sketches.hashing import splitmix64

    def _candidates(batch: pa.Table) -> pa.Table:
        if "_cap_key" in batch.column_names:
            batch = batch.drop_columns(["_cap_key"])
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if ids.dtype.kind not in "iu":
            raise TypeError("cap_per_group needs an integer id column")
        keys = splitmix64(ids.astype(np.uint64))
        codes_arr = batch[group_col].combine_chunks().dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, codes))  # group asc, key asc
        sc = codes[order]
        first = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        starts = np.repeat(first, np.diff(np.r_[first, len(sc)]))
        take = order[np.arange(len(sc)) - starts < k]
        out = batch.take(pa.array(take))
        return out.append_column("_cap_key", pa.array(keys[take], pa.uint64()))

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("_cap_key").head(k)
        return g.drop(columns=["_cap_key"])

    return (
        ds.map_batches(_candidates, batch_format="pyarrow")
        .map_batches(_candidates, batch_format="pyarrow", batch_size=8192)
        .groupby(group_col)
        .map_groups(_final, batch_format="pandas")
    )


def hash_split(ds, id_col: str, fractions: dict[str, float], salt: str = ""):
    """Deterministic train/val/test split by content hash: each row's
    split is ``md5(salt || id) % 100`` mapped through cumulative
    percentage bands (e.g. ``{"train": 0.90, "val": 0.05, "test": 0.05}``).

    The assignment is a pure function of the row id — stable across runs,
    partitionings, engines and corpus growth (a doc never changes split
    when new data arrives, the property random splits lack), and
    replicable in stock SQL via ``md5()``. One streaming ``map_batches``
    pass appends a ``split`` column; no shuffle, no state.

    ``fractions`` must sum to 1.0 (to within 1e-9) and splits are assigned
    in dict order, so band edges are reproducible: with the example above,
    buckets 0-89 -> train, 90-94 -> val, 95-99 -> test."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    names = list(fractions)
    pcts = [fractions[n] * 100 for n in names]
    if any(abs(p - round(p)) > 1e-6 for p in pcts):
        raise ValueError("fractions must be expressible in whole percent")
    edges = np.cumsum([int(round(p)) for p in pcts])

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().cast(pa.string())
        if salt:
            import pyarrow.compute as pc

            ids = pc.binary_join_element_wise(salt, ids, "")
        bucket = md5_bucket32(ids, 100)
        lab = np.empty(len(bucket), dtype=object)
        lo = 0
        for name, hi in zip(names, edges):
            lab[(bucket >= lo) & (bucket < hi)] = name
            lo = hi
        return batch.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def stratified_split_exact(ds, group_col: str, id_col: str,
                           fractions: dict[str, float], hist_bits: int = 12):
    """EXACT stratified train/val/test split: every group receives exactly
    ``(n_g * pct) // 100`` rows per band (cumulative integer bands over the
    group's rows ranked by ``splitmix64(id)``) — unlike ``hash_split``,
    where per-group proportions hold only in expectation.

    Equivalent to ``row_number() OVER (PARTITION BY group ORDER BY
    splitmix64(id)) <= (n*pct)//100`` — but computed WITHOUT any per-group
    sort or shuffle of the data, via distributed order statistics:

    1. one streaming pass builds per-(group, top-``hist_bits``-of-z) count
       histograms (mergeable integer partials; ``groups × 2^hist_bits``
       cells at most — a source taxonomy is small by construction, the
       only thing the driver holds);
    2. each band boundary rank is located in its histogram bucket; a second
       streaming pass gathers ONLY the rows landing in boundary buckets
       (expected ``n / 2^hist_bits`` rows per boundary) whose sorted keys
       pin the exact threshold key of each boundary rank;
    3. a third streaming pass assigns each row its band by binary search
       against the broadcast per-group thresholds.

    The corpus streams three times and never shuffles; only histograms and
    boundary-bucket keys (tiny) move. The assignment is a pure function of
    the row id — deterministic across runs, partitionings and cluster
    sizes (splitmix64 is bijective on unique int ids: total order, no
    ties). Like ``hash_split``, fractions must be whole percents summing
    to 1 so the band edges are exact integers on any engine."""
    from ..sketches.hashing import splitmix64

    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    names = list(fractions)
    pcts = [fractions[n] * 100 for n in names]
    if any(abs(p - round(p)) > 1e-6 for p in pcts):
        raise ValueError("fractions must be expressible in whole percent")
    cum_pcts = np.cumsum([int(round(p)) for p in pcts]).tolist()  # ends at 100
    shift = np.uint64(64 - hist_bits)

    def _keys(batch: pa.Table) -> np.ndarray:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if ids.dtype.kind not in "iu":
            raise TypeError("stratified_split_exact needs an integer id column")
        return splitmix64(ids.astype(np.uint64))

    # -- pass 1: per-(group, bucket) histograms ------------------------------
    def _hist(batch: pa.Table) -> pa.Table:
        z = _keys(batch)
        bucket = (z >> shift).astype(np.int64)
        g = batch[group_col].combine_chunks().dictionary_encode()
        codes = g.indices.to_numpy(zero_copy_only=False)
        uniques = g.dictionary.to_pylist()
        pair = codes.astype(np.int64) * (1 << hist_bits) + bucket
        up, cnt = np.unique(pair, return_counts=True)
        unames = np.array([str(u) for u in uniques], dtype=object)
        return pa.table(
            {
                "group": pa.array(unames[up >> hist_bits], pa.string()),
                "bucket": pa.array(up & ((1 << hist_bits) - 1), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    parts = pd.DataFrame(
        ds.map_batches(_hist, batch_format="pyarrow").take_all()
    )
    hist = parts.groupby(["group", "bucket"])["cnt"].sum()

    # boundary ranks per group: cumulative (n*pct)//100, last band = n
    boundary_buckets: dict[tuple[str, int], list[tuple[str, int, int]]] = {}
    group_sizes = hist.groupby(level=0).sum()
    for grp, n in group_sizes.items():
        buckets = hist.loc[grp]
        cum = buckets.cumsum()
        for j, cp in enumerate(cum_pcts[:-1]):  # the last edge is n itself
            r = (int(n) * cp) // 100
            if r == 0:
                continue  # empty prefix band: sentinel threshold 0
            bidx = int(cum.searchsorted(r))  # first bucket with cum >= r
            bucket_id = int(cum.index[bidx])
            before = int(cum.iloc[bidx - 1]) if bidx else 0
            boundary_buckets.setdefault((grp, bucket_id), []).append(
                (grp, j, r - before)  # offset-th smallest key in the bucket
            )

    # -- pass 2: gather only boundary-bucket keys -----------------------------
    bmap: dict[str, np.ndarray] = {}
    for g_, b_ in boundary_buckets:
        bmap.setdefault(g_, []).append(b_)
    bmap = {g_: np.array(sorted(bs), dtype=np.int64) for g_, bs in bmap.items()}

    def _gather(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        z = _keys(batch)
        bucket = (z >> shift).astype(np.int64)
        genc = batch[group_col].combine_chunks().dictionary_encode()
        codes = genc.indices.to_numpy(zero_copy_only=False)
        uniques = genc.dictionary.to_pylist()
        keep = np.zeros(len(z), dtype=bool)
        for code, grp in enumerate(uniques):
            bs = bmap.get(str(grp))
            if bs is not None:
                m = codes == code
                keep[m] = np.isin(bucket[m], bs)
        idx = np.flatnonzero(keep)
        return pa.table(
            {
                "group": pc.take(
                    batch[group_col].combine_chunks().cast(pa.string()), pa.array(idx)
                ),
                "bucket": pa.array(bucket[idx], pa.int64()),
                "z": pa.array(z[idx], pa.uint64()),
            }
        )

    cand = pd.DataFrame(ds.map_batches(_gather, batch_format="pyarrow").take_all())
    thresholds: dict[str, np.ndarray] = {
        str(g): np.zeros(len(cum_pcts) - 1, dtype=np.uint64) for g in group_sizes.index
    }
    if len(cand):
        for (grp, bucket_id), wants in boundary_buckets.items():
            zs = np.sort(
                cand.loc[
                    (cand["group"] == grp) & (cand["bucket"] == bucket_id), "z"
                ].to_numpy().astype(np.uint64)
            )
            for _, j, off in wants:
                thresholds[grp][j] = zs[off - 1]

    # -- pass 3: assign bands by binary search against the thresholds ---------
    name_arr = list(names)

    def _assign(batch: pa.Table) -> pa.Table:
        z = _keys(batch)
        g = batch[group_col].combine_chunks().dictionary_encode()
        codes = g.indices.to_numpy(zero_copy_only=False)
        uniques = g.dictionary.to_pylist()
        band = np.zeros(len(z), dtype=np.int64)
        for code, grp in enumerate(uniques):
            mask = codes == code
            th = thresholds[str(grp)]
            band[mask] = np.searchsorted(th, z[mask], side="left")
        lab = pa.array([name_arr[b] for b in band.tolist()], pa.string())
        return batch.append_column("split", lab)

    return ds.map_batches(_assign, batch_format="pyarrow")


def temperature_mix(ds, group_col: str, id_col: str, alpha: float = 0.5,
                    budget_frac: float = 0.5):
    """Temperature-balanced group mixing — the ``n^alpha`` source
    reweighting of multilingual/GPT-3-style training-data recipes
    (upweight low-resource groups, downsample dominant ones), realized as
    a DETERMINISTIC hash-rate filter.

    Per group ``s`` with ``n_s`` rows (N total): target share
    ``q_s = n_s^alpha / sum_t n_t^alpha`` (sum accumulated in group-name
    order, left to right — replicable float64), keep rate
    ``r_s = min(1, budget_frac*N*q_s / n_s)``, kept iff
    ``md5_32(id) < floor(r_s * 2^32)`` — the same content-hash primitive
    as ``hash_split``/``source_mix``, so the mix is identical under any
    partitioning, cluster size or engine.

    Scale shape: pass 1 reduces per-batch group counts (|groups| rows per
    block — a source taxonomy is small by construction, the ONLY thing
    the driver ever holds); pass 2 filters each batch against the
    broadcast threshold table. The corpus never shuffles.
    """
    import polars as pl

    def _counts(batch: pa.Table) -> pa.Table:
        return (
            pl.DataFrame({"g": pl.from_arrow(batch[group_col].combine_chunks())})
            .group_by("g").len(name="n").to_arrow()
        )

    parts = pd.DataFrame(ds.map_batches(_counts, batch_format="pyarrow").take_all())
    counts = parts.groupby("g")["n"].sum().sort_index()
    groups = counts.index.to_numpy()
    n = counts.to_numpy().astype(np.float64)
    ntot = float(n.sum())
    pw = np.power(n, alpha)
    den = 0.0
    for v in pw:  # fixed left-to-right order == the SQL oracle's nesting
        den += float(v)
    thr = np.floor(
        np.minimum(1.0, (budget_frac * ntot) * (pw / den) / n) * float(1 << 32)
    ).astype(np.int64)
    thr_map = dict(zip(groups.tolist(), thr.tolist()))

    def _filter(batch: pa.Table) -> pa.Table:
        g = pl.from_arrow(batch[group_col].combine_chunks())
        t = g.replace_strict(thr_map, default=0).cast(pl.Int64).to_numpy()
        bucket = md5_bucket32(batch[id_col], 1 << 32)
        return batch.filter(pa.array(bucket < t))

    return ds.map_batches(_filter, batch_format="pyarrow")
