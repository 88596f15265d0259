"""Exact Gram-matrix (X^T X) accumulator as a mergeable UDAF.

The distributed-linear-algebra partial: every batch of d-dimensional
vectors folds into one d x d matrix of int64 fixed-point products plus a
d-vector of component sums and a row count — enough to read out the Gram
matrix, the mean vector and the covariance matrix of the whole corpus
without the vectors ever shuffling. Merge = entrywise add (exactly order-
and partitioning-invariant, like the histogram sketch), so the result is
bit-identical at any num_cpus / merge topology and fully SQL-replicable.

Fixed-point contract: each component is quantised with
``floor(v * scale)`` (floor, NOT round — round-half ties would differ
between numpy's banker rounding and SQL's half-away rounding) and the
products are summed in int64. Choose ``scale`` so the global sums cannot
overflow: per entry ``|sum| <= n_rows * (scale * vmax)^2``, so with
unit-norm embeddings (vmax <= 1) ``scale = 2^15`` is safe to ~8.5e9 rows
and ``scale = 2^7`` to ~5e14 rows; pick ``scale <= sqrt(2^62 / n_rows)``
at 10^12-row scale. Precision: the quantisation error is deterministic
and identical everywhere, so the readout stays bit-reproducible; the
float readouts divide by ``scale^2`` once at the end.

This is the scale shape for PCA / whitening / linear probes over an
embedding column: one streaming pass, O(d^2) state, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register

__all__ = ["GramSketch"]


@register("gram")
class GramSketch:
    def __init__(self, dim: int, scale: int = 1 << 15):
        assert dim >= 1 and scale >= 1
        self.dim = int(dim)
        self.scale = int(scale)
        self.g = np.zeros((self.dim, self.dim), dtype=np.int64)
        self.sums = np.zeros(self.dim, dtype=np.int64)
        self.n = 0

    def update(self, values: np.ndarray) -> None:
        """Absorb vectors given as a flat float array (len % dim == 0) —
        the layout a flattened Arrow ``list<float>`` column arrives in."""
        if len(values) == 0:
            return
        v = np.asarray(values, dtype=np.float64).reshape(-1, self.dim)
        q = np.floor(v * self.scale).astype(np.int64)
        self.g += q.T @ q
        self.sums += q.sum(axis=0)
        self.n += q.shape[0]

    def merge(self, other: "GramSketch") -> "GramSketch":
        assert (self.dim, self.scale) == (other.dim, other.scale)
        self.g += other.g
        self.sums += other.sums
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        head = struct.pack("<qqq", self.dim, self.scale, self.n)
        return head + self.g.tobytes() + self.sums.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "GramSketch":
        dim, scale, n = struct.unpack_from("<qqq", data)
        sk = cls.__new__(cls)
        sk.dim, sk.scale, sk.n = dim, scale, n
        off = 24
        gbytes = dim * dim * 8
        sk.g = np.frombuffer(data[off : off + gbytes], dtype=np.int64).reshape(dim, dim).copy()
        sk.sums = np.frombuffer(data[off + gbytes : off + gbytes + dim * 8], dtype=np.int64).copy()
        return sk

    # -- readout --------------------------------------------------------------

    def gram_fixed(self) -> np.ndarray:
        """The exact int64 fixed-point Gram matrix (d x d)."""
        return self.g

    def gram(self) -> np.ndarray:
        """X^T X in input units (float64)."""
        return self.g / float(self.scale) ** 2

    def mean(self) -> np.ndarray:
        """Component-wise mean vector in input units."""
        if self.n == 0:
            return np.zeros(self.dim)
        return self.sums / (float(self.scale) * self.n)

    def covariance(self) -> np.ndarray:
        """Population covariance (biased, 1/n) in input units."""
        if self.n == 0:
            return np.zeros((self.dim, self.dim))
        mu = self.mean()
        return self.gram() / self.n - np.outer(mu, mu)
