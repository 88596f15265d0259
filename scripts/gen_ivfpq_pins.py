"""Generate golden pins for the knn_ivfpq driver oracle at sf0.01.

INDEPENDENT derivation (VERDICT r4 ask #6): this script re-implements the
whole IVF-PQ pipeline — deterministic id-hash sample, seeded Lloyd coarse
k-means with cosine assignment, per-subspace PQ k-means on residuals
(Jégou et al. 2011), ADC lookup-table scoring, global top-k — from the
PUBLISHED algorithm descriptions in pure numpy + polars + pyarrow, with
ZERO pprl_ray imports. An engine bug therefore shows up as a pin mismatch
instead of being echoed into the oracle. Every quantity here is a
deterministic function of (parquet bytes, seeds): the sample keeps rows by
polars id-hash threshold then sorts the (int64-cast) hashes; k-means inits
index by splitmix64 (public Steele et al. 2014 constants); all float work
uses the same numpy kernels (matmul / einsum / mean) in the same order as
any faithful implementation, so the pins are bit-stable on a fixed
BLAS/numpy and reproducible by re-running this script.

Parameters mirror __ray_entry__.q_knn_ivfpq: n_centroids=8, m=16,
n_codes=256, sample_size=2048, coarse iters=5, pq iters=10, seed=7,
queries = vec_id < 3, k=5, nprobe=4, scores rounded half-even to 4dp.

Usage: python scripts/gen_ivfpq_pins.py [sf_dir]  (default sf0.01)
Writes pprl_ray/golden/ivfpq_pins.py.
"""

import sys

import numpy as np
import polars as pl
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

N_CENTROIDS, M, N_CODES = 8, 16, 256
SAMPLE_SIZE, COARSE_ITERS, PQ_ITERS, SEED = 2048, 5, 10, 7
K, NPROBE = 5, 4

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x):
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z ^= z >> np.uint64(30)
        z *= _M1
        z ^= z >> np.uint64(27)
        z *= _M2
        z ^= z >> np.uint64(31)
    return z


def normalize(mat):
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def main():
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in tbl["embedding"].to_pylist()])
    n_rows = len(ids)

    # --- deterministic id-hash sample (threshold + int64-hash sort) ------
    fraction = min(1.0, (4.0 * SAMPLE_SIZE) / max(n_rows, 1))
    threshold = np.uint64(min(int(fraction * 2.0 ** 64), 2 ** 64 - 1))
    h = pl.Series(ids).hash(seed=SEED).to_numpy().astype(np.uint64)
    keep = h <= threshold
    hs = h[keep].astype(np.int64)
    order = np.argsort(hs, kind="stable")[:SAMPLE_SIZE]
    smat = normalize(mat[keep][order])

    # --- coarse k-means (cosine assignment, seeded init) -----------------
    idx = (splitmix64(np.arange(N_CENTROIDS, dtype=np.uint64) + np.uint64(SEED))
           % np.uint64(len(smat))).astype(np.int64)
    centroids = smat[np.unique(idx)]
    while len(centroids) < N_CENTROIDS:
        centroids = np.vstack([centroids, smat[len(centroids) % len(smat)][None]])
    for _ in range(COARSE_ITERS):
        assign = (smat @ centroids.T).argmax(axis=1)
        for c in range(N_CENTROIDS):
            members = smat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = normalize(centroids)

    # --- PQ codebooks on the sample's residuals --------------------------
    assign = (smat @ centroids.T).argmax(axis=1)
    resid = smat - centroids[assign]
    n, d = resid.shape
    dsub = d // M
    sub = resid.reshape(n, M, dsub)
    books = np.empty((M, N_CODES, dsub), np.float64)
    for s in range(M):
        x = sub[:, s, :]
        ii = (splitmix64(np.arange(N_CODES, dtype=np.uint64)
                         + np.uint64(SEED * 1000 + s))
              % np.uint64(n)).astype(np.int64)
        cents = x[np.unique(ii)]
        while len(cents) < N_CODES:
            cents = np.vstack([cents, x[len(cents) % n][None]])
        for _ in range(PQ_ITERS):
            a = (x @ cents.T - 0.5 * (cents ** 2).sum(axis=1)).argmax(axis=1)
            for c in range(N_CODES):
                members = x[a == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents

    # --- encode the full corpus ------------------------------------------
    nm = normalize(mat)
    bucket = (nm @ centroids.T).argmax(axis=1).astype(np.int64)
    res_all = (nm - centroids[bucket]).reshape(len(nm), M, dsub)
    codes = np.empty((len(nm), M), np.uint8)
    for s in range(M):
        cents = books[s]
        codes[:, s] = (res_all[:, s, :] @ cents.T
                       - 0.5 * (cents ** 2).sum(axis=1)).argmax(axis=1)

    # --- queries + ADC scoring over the union of probed buckets ----------
    qmask = ids < 3
    qids = ids[qmask]
    qnorm = normalize(mat[qmask])
    probe = np.argsort(-(qnorm @ centroids.T), axis=1)[:, :NPROBE]
    probed = sorted(set(int(b) for b in probe.ravel()))
    cand = np.isin(bucket, probed)
    cids, cb, ccodes = ids[cand], bucket[cand], codes[cand]

    qsub = qnorm.reshape(len(qnorm), M, dsub)
    luts = np.einsum("qsd,scd->qsc", qsub, books)
    qdotcent = qnorm @ centroids.T
    scores = np.ascontiguousarray(qdotcent[:, cb].T)  # (n_cand, q)
    for s in range(M):
        scores += luts[:, s, ccodes[:, s]].T

    rows = []
    for qi, qid in enumerate(qids):
        sc = scores[:, qi]
        srt = np.lexsort((cids, -sc))[:K]
        for r, j in enumerate(srt, 1):
            rows.append((int(qid), int(cids[j]),
                         float(np.round(sc[j], 4)), r))

    lines = [
        '"""Pinned knn_ivfpq expected top-k at sf0.01 (generated by',
        "scripts/gen_ivfpq_pins.py — an INDEPENDENT numpy re-derivation of",
        "the IVF-PQ math from the published algorithm, no pprl_ray imports;",
        'see its docstring). DO NOT EDIT BY HAND."""',
        "",
        "# (query_id, neighbor_id, score_4dp, rank)",
        "PIN_IVFPQ = [",
    ]
    for t in rows:
        lines.append(f"    ({t[0]}, {t[1]}, {t[2]!r}, {t[3]}),")
    lines.append("]")
    with open("pprl_ray/golden/ivfpq_pins.py", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(rows)} pins for {len(qids)} queries, "
          f"{len(cids)} candidates in buckets {probed}")


if __name__ == "__main__":
    main()
