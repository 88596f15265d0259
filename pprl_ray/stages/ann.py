"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), each batch computes a (batch, q) float32 matmul against it
  and emits per-batch top-k candidate rows; a tiny ``groupby(query_id)``
  reduction keeps the global top-k. The full corpus streams; only
  O(batches * q * k) candidate rows shuffle.
- :func:`build_ivf` / :func:`knn_ivf` — the scale path: an IVF-style coarse
  quantiser (centroids from a deterministic sample, Lloyd refinement) assigns
  every vector to a bucket in one broadcast pass; queries probe the
  ``nprobe`` nearest buckets only, pruning the scan with an Arrow filter at
  the read. Same top-k reduction.
- :func:`build_ivfpq` / :func:`knn_ivfpq` — the billion-scale path (IVF-PQ,
  Jégou et al. 2011): residual vectors product-quantized to ``m`` bytes, the
  index stores codes instead of raw vectors (~4d/m compression), queries
  read only probed bucket directories and score via broadcast ADC lookup
  tables — approximate, recall/error pytest-gated.
- :func:`embedding_near_dup_pairs` — near-duplicate vectors via random
  hyperplane LSH (Charikar 2002) bucketing + in-bucket cosine verification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.hashing import splitmix64

__all__ = [
    "knn_brute",
    "build_ivf",
    "knn_ivf",
    "write_ivf_index",
    "knn_ivf_pruned",
    "train_pq",
    "build_ivfpq",
    "write_ivfpq_index",
    "knn_ivfpq",
    "embedding_near_dup_pairs",
    "random_projection",
]


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        values = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        return values.reshape(len(arr), -1)
    # Ray tensor extension arrays / anything else: materialise row-wise
    return np.stack([np.asarray(x, dtype=np.float64) for x in arr.to_pylist()])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BruteTopK:
    """Stateless top-k kernel: fetches the (pre-normalized) broadcast query
    matrix per call — zero-copy local object-store read — so it runs as a
    plain task pool (no actor startup)."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        self.queries_ref = queries_ref
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        query_ids, qnorm = ray.get(self.queries_ref)
        mat = _normalize(_embedding_matrix(batch, self.vec_col))  # (n, d)
        sims = mat @ qnorm.T  # (n, q)
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        k = min(self.k, sims.shape[0])
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, q)
        q_idx = np.tile(np.arange(sims.shape[1]), k)
        n_idx = top.ravel()
        return pa.table(
            {
                "query_id": pa.array(np.asarray(query_ids, dtype=object)[q_idx]),
                "neighbor_id": pa.array(ids[n_idx]),
                "score": pa.array(sims[n_idx, q_idx], pa.float64()),
            }
        )


def _topk_reduce(cands, k: int):
    def _keep(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    return cands.groupby("query_id").map_groups(_keep, batch_format="pandas")


def knn_brute(ds, query_ids: list, query_matrix: np.ndarray, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding", **map_kwargs):
    """Exact cosine top-k of every query against the full dataset."""
    import ray

    ref = ray.put(
        (list(query_ids), _normalize(np.asarray(query_matrix, dtype=np.float64)))
    )
    map_kwargs.setdefault("batch_size", 4096)
    cands = ds.map_batches(
        _BruteTopK(ref, id_col, vec_col, k),
        batch_format="pyarrow",
        **map_kwargs,
    )
    return _topk_reduce(cands, k)


# --- IVF -------------------------------------------------------------------


def _deterministic_sample(ds, id_col: str, vec_col: str, sample_size: int,
                          seed: int) -> np.ndarray:
    """Normalized (sample_size, d) matrix drawn by id-hash — a distributed
    filter every partition contributes to (unlike a ``limit()``, which takes
    the FIRST blocks and biases on sorted/clustered inputs); hash order then
    picks exactly ``sample_size`` rows deterministically. The row count
    comes free from read metadata when available; otherwise one counting
    pass is spent (an index build warrants it)."""
    from .partitioning import free_num_rows

    n_rows = free_num_rows(ds)
    if n_rows is None:
        n_rows = ds.count()
    fraction = min(1.0, (4.0 * sample_size) / max(n_rows, 1))
    threshold = np.uint64(min(int(fraction * 2.0**64), 2**64 - 1))

    def _sample(batch: pa.Table) -> pa.Table:
        import polars as pl

        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = pl.from_arrow(ids).hash(seed=seed).to_numpy().astype(np.uint64)
        keep = h <= threshold
        vecs = batch[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        return pa.table(
            {
                "h": pa.array(h[keep].astype(np.int64), pa.int64()),
                vec_col: vecs.filter(pa.array(keep)),
            }
        )

    sample = ds.map_batches(_sample, batch_format="pyarrow").to_pandas()
    sample = sample.sort_values("h").head(sample_size).reset_index(drop=True)
    return _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    )


def _train_coarse(smat: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd k-means (cosine assignment) over a normalized sample."""
    idx = (splitmix64(np.arange(n_centroids, dtype=np.uint64) + np.uint64(seed))
           % np.uint64(len(smat))).astype(np.int64)
    centroids = smat[np.unique(idx)]
    while len(centroids) < n_centroids:  # de-dup shortfall: append next rows
        centroids = np.vstack([centroids, smat[len(centroids) % len(smat)][None]])
    for _ in range(iters):
        assign = (smat @ centroids.T).argmax(axis=1)
        for c in range(n_centroids):
            members = smat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def build_ivf(ds, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding",
              sample_size: int = 2048, iters: int = 5, seed: int = 7):
    """Train a coarse quantiser from a deterministic UNBIASED sample
    (:func:`_deterministic_sample`) and assign every vector to its nearest
    centroid. Returns (assigned_ds with ``bucket`` column, centroids)."""
    import ray

    smat = _deterministic_sample(ds, id_col, vec_col, sample_size, seed)
    centroids = _train_coarse(smat, n_centroids, iters, seed)

    cref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)  # zero-copy local object-store read
        mat = _normalize(_embedding_matrix(batch, vec_col))
        bucket = (mat @ cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket, pa.int32()))

    assigned = ds.map_batches(_assign, batch_format="pyarrow")
    return assigned, centroids


def knn_ivf(assigned_ds, centroids: np.ndarray, query_ids: list, query_matrix: np.ndarray,
            k: int = 10, nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Probe the ``nprobe`` nearest buckets per query set (union over
    queries), brute-force within. At scale the bucket filter prunes the scan
    to ~nprobe/n_centroids of the corpus (write the assigned table
    partitioned by ``bucket`` to prune at the read)."""
    qnorm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qnorm @ centroids.T), axis=1)[:, :nprobe]
    buckets = sorted(set(int(b) for b in probe.ravel()))

    import pyarrow.compute as pc

    pruned = assigned_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["bucket"], value_set=pa.array(buckets, pa.int32()))),
        batch_format="pyarrow",
    )
    return knn_brute(pruned, query_ids, query_matrix, k, id_col, vec_col)


def write_ivf_index(ds, path: str, n_centroids: int = 16, id_col: str = "vec_id",
                    vec_col: str = "embedding", **build_kwargs):
    """Persist an IVF index: the assigned table written to Parquet
    PARTITIONED BY BUCKET (one directory per bucket) plus the centroid
    matrix — the physical layout that lets queries prune at the READ, not
    post-read."""
    import os

    import pyarrow.parquet as pq

    assigned, centroids = build_ivf(ds, n_centroids, id_col, vec_col, **build_kwargs)
    assigned.write_parquet(path, partition_cols=["bucket"])
    pq.write_table(
        pa.table({"centroid": [c.tobytes() for c in centroids]}),
        os.path.join(path, "_centroids.parquet"),
    )
    return centroids


def knn_ivf_pruned(index_path: str, query_ids: list, query_matrix: np.ndarray,
                   k: int = 10, nprobe: int = 4, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Query a persisted IVF index reading ONLY the probed bucket
    partitions from storage (~nprobe/n_centroids of the corpus bytes) —
    column/partition pruning at the read, the 100-TB-correct shape."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    cent_tbl = pq.read_table(os.path.join(index_path, "_centroids.parquet"))
    centroids = np.stack(
        [np.frombuffer(b, dtype=np.float64) for b in cent_tbl["centroid"].to_pylist()]
    )
    qnorm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qnorm @ centroids.T), axis=1)[:, :nprobe]
    buckets = sorted(set(int(b) for b in probe.ravel()))

    paths = [p for b in buckets for p in glob.glob(f"{index_path}/bucket={b}/*.parquet")]
    pruned = rd.read_parquet(paths, columns=[id_col, vec_col])
    return knn_brute(pruned, query_ids, query_matrix, k, id_col, vec_col)


# --- IVF-PQ ------------------------------------------------------------------


def train_pq(vectors: np.ndarray, m: int = 8, n_codes: int = 16, iters: int = 10,
             seed: int = 13) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the d dims into ``m``
    subspaces and run an independent seeded Lloyd k-means (``n_codes``
    centroids, L2) in each. Returns (m, n_codes, d/m) float64 codebooks.
    Deterministic: splitmix64-seeded init, fixed iteration count."""
    n, d = vectors.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    sub = vectors.reshape(n, m, dsub)
    books = np.empty((m, n_codes, dsub), np.float64)
    for s in range(m):
        x = sub[:, s, :]
        idx = (splitmix64(
            np.arange(n_codes, dtype=np.uint64) + np.uint64(seed * 1000 + s)
        ) % np.uint64(n)).astype(np.int64)
        cents = x[np.unique(idx)]
        while len(cents) < n_codes:
            cents = np.vstack([cents, x[len(cents) % n][None]])
        for _ in range(iters):
            # L2 assignment: argmin ||x - c||^2 = argmax x.c - ||c||^2/2
            assign = (x @ cents.T - 0.5 * (cents**2).sum(axis=1)).argmax(axis=1)
            for c in range(n_codes):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def _pq_encode(resid: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) residuals -> (n, m) uint8 codes (argmin L2 per subspace)."""
    n, d = resid.shape
    m, n_codes, dsub = books.shape
    sub = resid.reshape(n, m, dsub)
    codes = np.empty((n, m), np.uint8)
    for s in range(m):
        cents = books[s]
        codes[:, s] = (sub[:, s, :] @ cents.T - 0.5 * (cents**2).sum(axis=1)).argmax(axis=1)
    return codes


def build_ivfpq(ds, n_centroids: int = 16, m: int = 8, n_codes: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding",
                sample_size: int = 2048, iters: int = 5, seed: int = 7):
    """IVF-PQ encode (the standard billion-scale ANN layout): a coarse
    quantiser routes each vector to a bucket; the RESIDUAL
    (vector - coarse centroid) is product-quantized to ``m`` bytes. The
    encoded table carries only (id, bucket, codes) — ``m`` bytes per
    vector instead of ``4*d`` — so a 100-TB embedding corpus compresses
    ~32x at d=64/m=8 before it ever hits the index files, and queries scan
    codes, never raw vectors.

    One deterministic sample trains both quantisers (coarse k-means, then
    per-subspace PQ k-means on the sample's residuals); assignment +
    encoding is a single broadcast ``map_batches`` pass over the corpus.
    Returns (encoded_ds(id, bucket, codes), centroids, codebooks)."""
    import ray

    smat = _deterministic_sample(ds, id_col, vec_col, sample_size, seed)
    centroids = _train_coarse(smat, n_centroids, iters, seed)
    assign = (smat @ centroids.T).argmax(axis=1)
    books = train_pq(smat - centroids[assign], m=m, n_codes=n_codes, seed=seed)

    ref = ray.put((centroids, books))

    def _encode(batch: pa.Table) -> pa.Table:
        cents, bks = ray.get(ref)  # zero-copy local object-store read
        mat = _normalize(_embedding_matrix(batch, vec_col))
        bucket = (mat @ cents.T).argmax(axis=1).astype(np.int32)
        codes = _pq_encode(mat - cents[bucket], bks)
        n, mm = codes.shape
        codes_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(mm), n, [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())]
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket, pa.int32()),
                "codes": codes_arr,
            }
        )

    return ds.map_batches(_encode, batch_format="pyarrow"), centroids, books


def write_ivfpq_index(ds, path: str, n_centroids: int = 16, m: int = 8,
                      n_codes: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding", **build_kwargs):
    """Persist an IVF-PQ index: the (id, bucket, codes) table written to
    Parquet PARTITIONED BY BUCKET plus a sidecar with the coarse centroids
    and PQ codebooks — queries read only probed bucket directories, and
    those directories hold m-byte codes, not 4*d-byte vectors."""
    import os

    import pyarrow.parquet as pq

    encoded, centroids, books = build_ivfpq(
        ds, n_centroids, m, n_codes, id_col, vec_col, **build_kwargs
    )
    from .partitioning import compact_blocks

    # bucket rides twice: as the partition directory key (pruned reads) AND
    # as a plain column `b` (the reader needs it per row for the q.centroid
    # term without re-deriving it from file paths); compact first so the
    # partitioned write emits ~blocks*buckets files, not one per scan block
    encoded = compact_blocks(encoded.materialize(), min_blocks=4).map_batches(
        lambda t: t.append_column("b", t["bucket"]), batch_format="pyarrow"
    )
    encoded.write_parquet(path, partition_cols=["bucket"])
    meta = pa.table(
        {
            "kind": ["centroids", "codebooks"],
            "shape": [list(centroids.shape), list(books.shape)],
            "blob": [centroids.tobytes(), books.tobytes()],
        }
    )
    pq.write_table(meta, os.path.join(path, "_pq_meta.parquet"))
    return centroids, books


class _ADCTopK:
    """Asymmetric-distance top-k over probed code batches: approximate
    score(q, v) = q . centroid_{b(v)} + sum_m LUT[q][m][code_m], where
    LUT[q][m][c] = q_sub[m] . codebook[m][c] — the classic ADC
    inner-product decomposition; one (n, q) lookup-sum per batch, no
    vector decode. Rows carry their bucket in the ``b`` column, so ONE
    dataset over all probed directories suffices."""

    def __init__(self, ref, id_col: str, k: int):
        self.ref = ref
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        query_ids, luts, qdotcent = ray.get(self.ref)
        m = luts.shape[1]
        codes_col = batch["codes"]
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        if pa.types.is_fixed_size_binary(codes_col.type):
            off = codes_col.offset * m
            codes = np.frombuffer(codes_col.buffers()[1], np.uint8)[
                off : off + len(codes_col) * m
            ].reshape(-1, m)
        else:
            codes = np.frombuffer(b"".join(codes_col.to_pylist()), np.uint8).reshape(-1, m)
        n, q = len(codes), luts.shape[0]
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        scores = np.ascontiguousarray(qdotcent[:, b].T)  # (n, q)
        for s in range(m):
            scores += luts[:, s, codes[:, s]].T  # (n, q)
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        k = min(self.k, n)
        top = np.argpartition(-scores, k - 1, axis=0)[:k]
        q_idx = np.tile(np.arange(q), k)
        n_idx = top.ravel()
        return pa.table(
            {
                "query_id": pa.array(np.asarray(query_ids, dtype=object)[q_idx]),
                "neighbor_id": pa.array(ids[n_idx]),
                "score": pa.array(scores[n_idx, q_idx], pa.float64()),
            }
        )


def knn_ivfpq(index_path: str, query_ids: list, query_matrix: np.ndarray,
              k: int = 10, nprobe: int = 4, id_col: str = "vec_id"):
    """Approximate cosine top-k against a persisted IVF-PQ index: probe the
    ``nprobe`` nearest buckets per query set, read ONLY those bucket
    directories (codes + ids — ~m/(4d) of the raw corpus bytes), score via
    ADC lookup tables broadcast once, reduce per-batch top-k candidates.
    Approximate by construction (quantized residuals) — recall and score-
    error are pytest-gated, not SQL-oracled."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    meta = pq.read_table(os.path.join(index_path, "_pq_meta.parquet"))
    blobs = {r["kind"]: (r["shape"], r["blob"]) for r in meta.to_pylist()}
    centroids = np.frombuffer(blobs["centroids"][1], np.float64).reshape(
        blobs["centroids"][0]
    )
    books = np.frombuffer(blobs["codebooks"][1], np.float64).reshape(
        blobs["codebooks"][0]
    )
    m, _, dsub = books.shape

    qnorm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(qnorm @ centroids.T), axis=1)[:, :nprobe]
    buckets = sorted(set(int(b) for b in probe.ravel()))

    # ADC tables: luts[q, s, c] = q_sub[s] . codebook[s][c]
    qsub = qnorm.reshape(len(qnorm), m, dsub)
    luts = np.einsum("qsd,scd->qsc", qsub, books)
    qdotcent = qnorm @ centroids.T  # (q, n_centroids)
    ref = ray.put((list(query_ids), luts, qdotcent))

    # ONE dataset over every probed directory (rows carry their bucket in
    # `b`); per-batch top-k leaves only O(read-tasks * q * k) candidate
    # rows, which are compacted to a handful of blocks before the final
    # groupby so the reduce doesn't pay per-block dispatch on hundreds of
    # 15-row blocks
    from .partitioning import compact_blocks

    paths = [p for b in buckets for p in glob.glob(f"{index_path}/bucket={b}/*.parquet")]
    cands = rd.read_parquet(paths, columns=[id_col, "codes", "b"]).map_batches(
        _ADCTopK(ref, id_col, k), batch_format="pyarrow"
    )
    return _topk_reduce(compact_blocks(cands.materialize(), min_blocks=1), k)


# --- embedding near-dup ----------------------------------------------------


def random_projection(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                      out_dim: int = 16, seed: int = 841):
    """Johnson–Lindenstrauss dimensionality reduction with a seeded
    Rademacher matrix (Achlioptas 2003: entries ±1/√k preserve pairwise
    distances within (1±ε) at k = O(log n / ε²)): ``y = x @ R / sqrt(k)``
    with ``R[j, i] = +1 iff splitmix64(seed + j*k + i) is odd``.

    The matrix is a pure function of (d, out_dim, seed), REGENERATED
    inside each task from the seed — nothing is broadcast, nothing
    shuffles, the pass is embarrassingly parallel over batches (the right
    shape for a 100-TB corpus: projection cost is one (batch, d) x (d, k)
    float64 matmul). Returns long-form ``(id, dim:int32, y:float64)``
    rows — ``out_dim`` per input vector."""
    import pyarrow.compute as pc

    def _project(batch: pa.Table) -> pa.Table:
        X = _embedding_matrix(batch, vec_col)
        n = len(batch)
        d = X.shape[1] if X.size else 0
        idxs = np.arange(d * out_dim, dtype=np.uint64) + np.uint64(seed)
        R = np.where(
            splitmix64(idxs) % np.uint64(2) == np.uint64(1), 1.0, -1.0
        ).reshape(d, out_dim)
        Y = (X @ R) / np.sqrt(out_dim) if d else np.zeros((n, out_dim))
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        rep = np.repeat(np.arange(n), out_dim)
        return pa.table(
            {
                id_col: pc.take(ids, pa.array(rep, pa.int64())),
                "dim": pa.array(np.tile(np.arange(out_dim, dtype=np.int32), n)),
                "y": pa.array(Y.ravel(), pa.float64()),
            }
        )

    return ds.map_batches(_project, batch_format="pyarrow")


def embedding_near_dup_pairs(ds, threshold: float = 0.95, n_planes: int = 16,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             max_bucket: int = 1000, seed: int = 11,
                             partitions: int | None = None):
    """Cosine near-dup pairs via random-hyperplane signature blocking
    (Charikar 2002): rows sharing a ``n_planes``-bit sign pattern are
    candidates; exact cosine verifies.

    Scale shape: buckets reduce in ``code % partitions`` groups (per-group
    Python is O(partitions), not O(2^n_planes)); in-bucket pairing is one
    vectorised self-merge + batched row-dot — no per-pair Python. The
    normalized float32 vector rides the exchange (compact; re-joining
    vectors to pairs would cost two more corpus shuffles)."""
    planes_holder: dict[int, np.ndarray] = {}
    if partitions is None:
        from .partitioning import auto_partitions

        partitions = auto_partitions(ds)

    def _sig(batch: pa.Table) -> pa.Table:
        mat = _normalize(_embedding_matrix(batch, vec_col))
        d = mat.shape[1]
        if d not in planes_holder:
            planes_holder[d] = np.random.default_rng(seed).standard_normal((d, n_planes))
        planes = planes_holder[d]
        signs = (mat @ planes) > 0
        code = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        mat32 = mat.astype(np.float32)
        return pa.table(
            {
                id_col: batch[id_col],
                "code": pa.array(code, pa.int64()),
                "part": pa.array((code % np.int64(partitions)).astype(np.int32)),
                "vec": pa.array([row.tobytes() for row in mat32], pa.large_binary()),
            }
        )

    coded = ds.map_batches(_sig, batch_format="pyarrow")

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col).reset_index(drop=True)
        g = g[g.groupby("code").cumcount() < max_bucket].reset_index(drop=True)
        empty = {
            "id_a": pd.Series(dtype=g[id_col].dtype),
            "id_b": pd.Series(dtype=g[id_col].dtype),
            "cosine": pd.Series(dtype=np.float64),
        }
        if len(g) < 2:
            return pd.DataFrame(empty)
        idx = np.arange(len(g))
        left = pd.DataFrame({"code": g["code"].to_numpy(), "i": idx})
        m = left.merge(left.rename(columns={"i": "j"}), on="code")
        m = m[m["i"] < m["j"]]
        if len(m) == 0:
            return pd.DataFrame(empty)
        i, j = m["i"].to_numpy(), m["j"].to_numpy()
        vecs = np.frombuffer(b"".join(g["vec"]), dtype=np.float32).reshape(len(g), -1).astype(np.float64)
        sims = (vecs[i] * vecs[j]).sum(axis=1)
        keep = sims >= threshold
        ids = g[id_col].to_numpy()
        return pd.DataFrame(
            {"id_a": ids[i[keep]], "id_b": ids[j[keep]], "cosine": sims[keep]}
        )

    return coded.groupby("part").map_groups(_pairs, batch_format="pandas")
