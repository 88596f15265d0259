"""Frequent-Directions matrix sketch: a mergeable low-rank summary of a
row stream.

Liberty, "Simple and Deterministic Matrix Sketching" (KDD 2013) with the
2l-row buffer and the Ghashami-Liberty-Phillips-Woodruff (SIAM J. Comput.
2016) analysis: maintaining at most ``2*ell`` rows and shrinking singular
values by ``sigma_ell^2`` on overflow yields B with

    || A^T A - B^T B ||_2  <=  ||A||_F^2 / ell

and the sketch is MERGEABLE — concatenating two sketches' rows and
re-compacting preserves the bound (GLPW Thm. 3.1), which is exactly the
UDAF contract. This is the O(ell*d) scale path for covariance / PCA over
embedding columns when d is too large for the exact O(d^2)
:class:`~pprl_ray.sketches.gram.GramSketch` partials (d ~ 10^5+ feature
spaces); both share the "vectors never shuffle" shape.

Merge results are order-invariant within the published bound (like
t-digest/KLL, unlike the bit-exact Bloom/HLL/CMS); single-topology runs
are deterministic because compaction points depend only on the row
sequence and LAPACK SVD is deterministic per host.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register

__all__ = ["FrequentDirectionsSketch"]


@register("fd")
class FrequentDirectionsSketch:
    def __init__(self, dim: int, ell: int = 16):
        assert dim >= 1 and 1 <= ell
        self.dim = int(dim)
        self.ell = int(ell)
        self.rows = np.zeros((0, self.dim), dtype=np.float64)
        self.fnorm2 = 0.0  # exact ||A||_F^2 accumulator (drives the bound)
        self.n = 0

    # -- core -----------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        """Absorb vectors given as a flat float array (len % dim == 0) —
        the layout a flattened Arrow ``list<float>`` column arrives in."""
        values = np.asarray(values, dtype=np.float64)
        if values.size == 0:
            return
        X = values.reshape(-1, self.dim)
        self.n += X.shape[0]
        self.fnorm2 += float((X * X).sum())
        self._insert(X)

    def _insert(self, X: np.ndarray) -> None:
        cap = 2 * self.ell
        i = 0
        while i < X.shape[0]:
            if self.rows.shape[0] >= cap:
                self._compact()
            take = min(cap - self.rows.shape[0], X.shape[0] - i)
            self.rows = np.vstack([self.rows, X[i : i + take]])
            i += take

    def _compact(self) -> None:
        s, vt = np.linalg.svd(self.rows, full_matrices=False)[1:]
        s2 = s * s
        delta = s2[self.ell] if len(s2) > self.ell else 0.0
        s_new = np.sqrt(np.maximum(s2 - delta, 0.0))
        nz = s_new > 1e-12 * (s_new[0] if len(s_new) else 1.0)
        self.rows = s_new[nz, None] * vt[nz]

    def merge(self, other: "FrequentDirectionsSketch") -> "FrequentDirectionsSketch":
        assert self.dim == other.dim and self.ell == other.ell
        self.n += other.n
        self.fnorm2 += other.fnorm2
        if other.rows.shape[0]:
            self._insert(other.rows)
        return self

    # -- readout ----------------------------------------------------------

    def gram(self) -> np.ndarray:
        """B^T B — the d x d approximation of A^T A (additive spectral
        error <= error_bound())."""
        return self.rows.T @ self.rows

    def spectrum(self, k: int) -> np.ndarray:
        """Top-k eigenvalues of B^T B (= squared singular values of B),
        zero-padded — each within error_bound() of A^T A's eigenvalue."""
        s = np.linalg.svd(self.rows, compute_uv=False) if self.rows.size else np.empty(0)
        out = np.zeros(k, dtype=np.float64)
        top = np.sort(s * s)[::-1][:k]
        out[: len(top)] = top
        return out

    def error_bound(self) -> float:
        """The proven spectral-error ceiling ||A||_F^2 / ell."""
        return self.fnorm2 / self.ell

    # -- serialisation ----------------------------------------------------

    def to_bytes(self) -> bytes:
        r = np.ascontiguousarray(self.rows, dtype=np.float64)
        head = struct.pack("<iiqdi", self.dim, self.ell, self.n, self.fnorm2,
                           r.shape[0])
        return head + r.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "FrequentDirectionsSketch":
        dim, ell, n, fnorm2, nrows = struct.unpack_from("<iiqdi", data)
        sk = cls(dim, ell)
        sk.n = n
        sk.fnorm2 = fnorm2
        off = struct.calcsize("<iiqdi")
        sk.rows = (
            np.frombuffer(data, dtype=np.float64, offset=off, count=nrows * dim)
            .reshape(nrows, dim)
            .copy()
        )
        return sk
