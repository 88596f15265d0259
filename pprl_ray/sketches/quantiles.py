"""Quantile sketches: merging t-digest and KLL.

- ``TDigestSketch``: Dunning & Ertl, "Computing Extremely Accurate Quantiles
  Using t-Digests" (arXiv:1902.04023), merging variant with the k1 scale
  function ``k(q) = (δ/2π)·asin(2q-1)`` — accuracy concentrated at the tails.
- ``KLLSketch``: Karnin, Lang & Liberty, "Optimal Quantile Approximation in
  Streams" (FOCS 2016): a ladder of compactors with capacities decaying by
  (2/3)^depth; rank error ε with k = O((1/ε)·sqrt(log 1/δ)).

Both merge by combining state and re-compressing. Merge results are
order-invariant *within the published rank-error bound* (unlike Bloom/HLL/CMS
which are bit-exact under reordering); the property tests assert the bound
holds for every merge order. The KLL compaction coin is drawn from a
splitmix64 counter seeded per sketch, so single-topology runs are
reproducible.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import splitmix64

__all__ = ["TDigestSketch", "KLLSketch"]


@register("tdigest")
class TDigestSketch:
    def __init__(self, compression: float = 200.0):
        self.delta = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self.min = np.inf
        self.max = -np.inf
        self.count = 0.0

    # -- core ----------------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.min = min(self.min, float(values.min()))
        self.max = max(self.max, float(values.max()))
        self.count += len(values)
        self._buf.append(values)
        self._buf_n += len(values)
        if self._buf_n > 8 * self.delta:
            self._compress()

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        # NOTE: no early-return on small centroid counts — merge()
        # concatenates centroid arrays unsorted, and quantile()/rank()
        # interpolate over cumulative weights assuming SORTED means, so
        # _compress must always re-sort even when no shrinking is needed.
        if self._buf:
            bm = np.concatenate(self._buf)
            means = np.concatenate([self.means, bm])
            weights = np.concatenate([self.weights, np.ones(len(bm))])
            self._buf, self._buf_n = [], 0
        else:
            means, weights = self.means, self.weights
        if len(means) == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        if len(means) <= self.delta:
            # under budget: keep every centroid (maximum accuracy), sorted
            self.means, self.weights = means, weights
            return
        total = weights.sum()

        # Fully vectorised clustering: bin centroids by the integer part of
        # the k1 scale function at their cumulative-weight midpoint. Bins
        # have unit k-width, so each output centroid obeys the same
        # k(q_right) - k(q_left) <= 1 size bound as the sequential greedy
        # merge (accuracy concentrated at the tails); merging within a bin
        # is one weighted-mean reduceat.
        cum = np.cumsum(weights)
        qmid = (cum - weights / 2) / total
        # half-unit k bins: twice the centroid resolution of the greedy
        # unit-step merge (count still O(delta)), comfortably inside the
        # k1-scale rank-error bound after repeated re-compressions
        bins = np.floor(2.0 * self._k(qmid))
        starts = np.flatnonzero(np.diff(bins, prepend=bins[0] - 1) != 0)
        wsum = np.add.reduceat(weights, starts)
        msum = np.add.reduceat(means * weights, starts)
        self.means = msum / wsum
        self.weights = wsum

    def merge(self, other: "TDigestSketch") -> "TDigestSketch":
        assert self.delta == other.delta
        other_flushed = other._flushed()
        self._compress()
        self.means = np.concatenate([self.means, other_flushed[0]])
        self.weights = np.concatenate([self.weights, other_flushed[1]])
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.count += other.count
        self._compress()
        return self

    def _flushed(self) -> tuple[np.ndarray, np.ndarray]:
        self._compress()
        return self.means, self.weights

    # -- estimators ----------------------------------------------------------

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid centers in cumulative-weight space
        cum = np.cumsum(w) - w / 2
        target = q * total
        if target <= cum[0]:
            return float(self.min + (self.means[0] - self.min) * max(target, 0) / max(cum[0], 1e-12))
        if target >= cum[-1]:
            span = total - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 0.0
            return float(self.means[-1] + (self.max - self.means[-1]) * min(frac, 1.0))
        j = int(np.searchsorted(cum, target))
        m0, m1 = self.means[j - 1], self.means[j]
        c0, c1 = cum[j - 1], cum[j]
        return float(m0 + (m1 - m0) * (target - c0) / (c1 - c0))

    def rank(self, x: float) -> float:
        """Approximate CDF(x)."""
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        w = self.weights
        total = w.sum()
        cum = np.cumsum(w) - w / 2
        return float(np.interp(x, self.means, cum / total, left=0.0, right=1.0))

    # -- serialisation -------------------------------------------------------

    def to_bytes(self) -> bytes:
        self._compress()
        header = struct.pack("<dddq", self.delta, self.min, self.max, int(self.count))
        return header + struct.pack("<q", len(self.means)) + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigestSketch":
        delta, mn, mx, count = struct.unpack_from("<dddq", data)
        (n,) = struct.unpack_from("<q", data, 32)
        sk = cls(delta)
        sk.min, sk.max, sk.count = mn, mx, float(count)
        off = 40
        sk.means = np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
        sk.weights = np.frombuffer(data, dtype=np.float64, count=n, offset=off + 8 * n).copy()
        return sk


@register("kll")
class KLLSketch:
    def __init__(self, k: int = 200, seed: int = 0):
        self.k = int(k)
        self.seed = int(seed)
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self._coin_ctr = np.uint64(seed)

    def _capacity(self, level: int) -> int:
        depth = len(self.compactors)
        return max(int(np.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - level))), 2)

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _max_size(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.compactors)))

    def _coin(self) -> int:
        self._coin_ctr += np.uint64(1)
        return int(splitmix64(np.array([self._coin_ctr], dtype=np.uint64))[0] & np.uint64(1))

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.n += len(values)
        self.compactors[0].extend(values.tolist())
        self._compact_if_needed()

    def _compact_if_needed(self) -> None:
        while self._size() > self._max_size():
            for level in range(len(self.compactors)):
                if len(self.compactors[level]) > self._capacity(level):
                    self._compact_level(level)
                    break
            else:
                break

    def _compact_level(self, level: int) -> None:
        if level + 1 >= len(self.compactors):
            self.compactors.append([])
        items = sorted(self.compactors[level])
        offset = self._coin()
        self.compactors[level + 1].extend(items[offset::2])
        self.compactors[level] = []

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        assert self.k == other.k
        while len(self.compactors) < len(other.compactors):
            self.compactors.append([])
        for level, items in enumerate(other.compactors):
            self.compactors[level].extend(items)
        self.n += other.n
        self._compact_if_needed()
        return self

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for level, items in enumerate(self.compactors):
            if items:
                vals.append(np.array(items))
                weights.append(np.full(len(items), 1 << level, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        return float(w[v <= x].sum() / w.sum())

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        j = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(j, len(v) - 1)])

    def to_bytes(self) -> bytes:
        header = struct.pack("<qqqq", self.k, self.seed, self.n, len(self.compactors))
        parts = [header]
        for c in self.compactors:
            arr = np.array(c, dtype=np.float64)
            parts.append(struct.pack("<q", len(arr)))
            parts.append(arr.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        k, seed, n, n_levels = struct.unpack_from("<qqqq", data)
        sk = cls(k, seed)
        sk.n = n
        sk.compactors = []
        off = 32
        for _ in range(n_levels):
            (cnt,) = struct.unpack_from("<q", data, off)
            off += 8
            sk.compactors.append(np.frombuffer(data, dtype=np.float64, count=cnt, offset=off).tolist())
            off += 8 * cnt
        return sk
