"""Distributed k-means over an embedding column + semantic dedup.

Lloyd's algorithm (public classic; MacQueen 1967) in the broadcast-
centroids shape: centroids live in the object store (``ray.put`` once per
iteration), every batch computes assignments with one numpy matmul and
emits tiny per-cluster (sum_vec, count) partials; the driver reduces a
k x dim matrix — the corpus itself never shuffles and never materializes.

Initialization is DETERMINISTIC and partitioning-invariant: the k rows
with the smallest 64-bit hash of their id (a distributed bottom-k, the
same primitive as the theta sketch) — so runs are reproducible at any
``num_cpus``, unlike random inits.

Semantic dedup (the SemDeDup recipe, Abbas et al. 2023, public):
cluster the embeddings, then search for near-duplicate pairs ONLY within
each cluster (cosine >= threshold, keep min id) — an O(n^2/k) candidate
space instead of all-pairs. Like every banded/bucketed dedup here, the
within-cluster pass is exact; misses are only cross-cluster pairs (the
documented approximation; raise k_clusters to trade recall for cost).

Reference parity: none (the reference has no vector ops); scale shape
mirrors stages/ann.py (broadcast small side, streamed corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.hashing import hash_ints
from .ann import _embedding_matrix, _normalize

__all__ = [
    "kmeans_fit",
    "kmeans_assign",
    "semantic_dedup_pairs",
    "lloyd_step",
    "group_centroids",
]


def _bottomk_rows(ds, id_col: str, vec_col: str, k: int, seed: int) -> np.ndarray:
    """Deterministic init: embeddings of the k ids with smallest hash —
    per-batch partial bottom-k, tiny driver merge (exact, topology-free)."""

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        h = hash_ints(ids.astype(np.int64), seed)
        take = np.argsort(h, kind="stable")[:k]
        mat = _embedding_matrix(batch, vec_col)[take]
        return pa.table(
            {
                "h": pa.array(h[take].astype(np.uint64), pa.uint64()),
                "vec": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    # canonical total order (hash, then vector bytes): take_all() block
    # arrival order is scheduling-dependent, so a bare stable sort on h
    # could break hash ties differently run-to-run
    parts.sort(key=lambda r: (r["h"], np.asarray(r["vec"], dtype=np.float64).tobytes()))
    return np.array([r["vec"] for r in parts[:k]], dtype=np.float64)


def lloyd_step(ds, centroids: np.ndarray, vec_col: str = "embedding") -> np.ndarray:
    """One Lloyd iteration: streaming pass emitting (cluster, sum_vec,
    count) partials per batch against the broadcast centroids, tiny
    block-ordered driver reduce; empty clusters keep their previous
    centroid. Deterministic given the input block topology."""
    import ray

    ref = ray.put(centroids)
    k = len(centroids)

    def _partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)  # zero-copy local read
        mat = _embedding_matrix(batch, vec_col)
        # matmul form: argmin_c |x-c|^2 = argmin_c (-2 x.c + |c|^2)
        d2 = -2.0 * (mat @ cents.T) + (cents**2).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=len(cents)).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(np.arange(len(cents), dtype=np.int32)),
                "sum_vec": pa.array(list(sums), pa.list_(pa.float64())),
                "count": pa.array(counts, pa.int64()),
            }
        )

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    # canonical partial order before the float reduce: take_all() returns
    # blocks in completion order (preserve_order is off), and float += is
    # not associative — sorting by (cluster, payload bytes) makes the
    # summation order, hence the centroid bytes, load-independent (same
    # fix as the canonical blob order in sketch group merges)
    rows.sort(
        key=lambda r: (
            r["cluster"],
            r["count"],
            np.asarray(r["sum_vec"], dtype=np.float64).tobytes(),
        )
    )
    sums = np.zeros_like(centroids)
    counts = np.zeros(k, dtype=np.int64)
    for r in rows:
        sums[r["cluster"]] += np.asarray(r["sum_vec"])
        counts[r["cluster"]] += r["count"]
    nonempty = counts > 0
    out = centroids.copy()
    out[nonempty] = sums[nonempty] / counts[nonempty, None]
    return out


def kmeans_fit(ds, k: int = 8, vec_col: str = "embedding", id_col: str = "vec_id",
               iters: int = 10, seed: int = 0) -> np.ndarray:
    """Fit k centroids; returns the (k, dim) centroid matrix."""
    centroids = _bottomk_rows(ds, id_col, vec_col, k, seed)
    for _ in range(iters):
        centroids = lloyd_step(ds, centroids, vec_col)
    return centroids


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """(id, cluster) Dataset — one matmul per batch vs broadcast centroids."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        mat = _embedding_matrix(batch, vec_col)
        d2 = -2.0 * (mat @ cents.T) + (cents**2).sum(axis=1)[None, :]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int32)),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


def semantic_dedup_pairs(ds, centroids: np.ndarray, threshold: float,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         round_to: int = 4):
    """Within-cluster near-duplicate pairs (cosine >= threshold, id_a <
    id_b) as a Dataset — the SemDeDup candidate pass. Each cluster's rows
    co-locate via one groupby shuffle of (id, cluster, vec); the per-
    cluster all-pairs is vectorised (n_c x n_c matmul, n_c ~ n/k)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _tag(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        mat = _embedding_matrix(batch, vec_col)
        d2 = -2.0 * (mat @ cents.T) + (cents**2).sum(axis=1)[None, :]
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int32)),
                "vec": pa.array(list(_normalize(mat)), pa.list_(pa.float64())),
            }
        )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        mat = np.stack(g["vec"].to_numpy())
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        hit = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[hit]],
                "id_b": ids[ib[hit]],
                "cosine": np.round(sims[ia[hit], ib[hit]], round_to),
            }
        )

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return tagged.groupby("cluster").map_groups(_pairs, batch_format="pandas")


def group_centroids(ds, key_col: str, vec_col: str = "embedding",
                    scale: int = 1_000_000_000):
    """Exact per-key mean vector (vector-valued grouped aggregate).

    Each batch folds its rows into one (key, sum_vec, count) partial per
    key — the raw vectors never shuffle, only k x dim partials move — and
    the driver reduces in canonical order. Sums run in FIXED-POINT int64
    (``round(v * scale)``), so the distributed result is exactly the
    single-machine result regardless of partial arrival order or merge
    topology, and is replicable in stock SQL — the same exactness trick
    as the micro-unit revenue aggregates. int64 headroom: |v| * scale *
    rows_per_key must stay < 2^63 (~9.2e18); the default scale leaves
    room for ~9e9 unit-norm rows per key.

    Returns a pandas frame ``(key, n, mean_vec: list<float64>)`` — keys
    are assumed LOW-cardinality (label/cluster/source); for unbounded
    keys write the partials through a groupby instead."""

    def _partial(batch: pa.Table) -> pa.Table:
        keys_arr = batch[key_col]
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        codes_arr = keys_arr.dictionary_encode()
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        uniques = codes_arr.dictionary.to_pylist()
        mat = _embedding_matrix(batch, vec_col)
        fixed = np.round(mat.astype(np.float64) * scale).astype(np.int64)
        k = len(uniques)
        sums = np.zeros((k, fixed.shape[1]), dtype=np.int64)
        np.add.at(sums, codes, fixed)
        counts = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table(
            {
                "key": pa.array([str(u) for u in uniques], pa.string()),
                "sum_vec": pa.array(list(sums), pa.list_(pa.int64())),
                "n": pa.array(counts, pa.int64()),
            }
        )

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    # integer sums are order-invariant, but sort anyway for a stable
    # output row order
    rows.sort(key=lambda r: r["key"])
    acc: dict[str, list] = {}
    for r in rows:
        a = acc.setdefault(r["key"], [None, 0])
        v = np.asarray(r["sum_vec"], dtype=np.int64)
        a[0] = v if a[0] is None else a[0] + v
        a[1] += r["n"]
    return pd.DataFrame(
        [
            {
                "key": k,
                "n": n,
                "mean_vec": (s.astype(np.float64) / scale / n).tolist(),
            }
            for k, (s, n) in acc.items()
        ]
    )
