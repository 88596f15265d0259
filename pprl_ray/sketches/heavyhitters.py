"""Misra-Gries heavy-hitters summary (Misra & Gries, "Finding repeated
elements", Sci. Comput. Program. 1982; mergeable form per Agarwal et al.,
"Mergeable Summaries", PODS 2012).

k counters; every stored count undercounts the true frequency by at most
N/k (N = total items). Any item with true count > N/k is guaranteed
present. Merge = add counters, then subtract the (k+1)-largest count from
all and drop non-positive — the PODS-2012 mergeable rule, which preserves
the N/k bound under arbitrary merge trees.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register

__all__ = ["MGSketch"]


@register("mg")
class MGSketch:
    def __init__(self, k: int = 256):
        self.k = int(k)
        self.counters: dict[int, int] = {}
        self.total = 0

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        values = np.asarray(values)
        if counts is None:
            values, counts = np.unique(values, return_counts=True)
        self.total += int(counts.sum())
        c = self.counters
        for v, n in zip(values.tolist(), counts.tolist()):
            c[v] = c.get(v, 0) + n
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        counts = np.fromiter(self.counters.values(), dtype=np.int64)
        # subtract the (k+1)-largest count, drop non-positive
        thresh = np.partition(counts, -(self.k + 1))[-(self.k + 1)]
        self.counters = {
            v: n - int(thresh) for v, n in self.counters.items() if n - thresh > 0
        }

    def merge(self, other: "MGSketch") -> "MGSketch":
        assert self.k == other.k
        for v, n in other.counters.items():
            self.counters[v] = self.counters.get(v, 0) + n
        self.total += other.total
        self._shrink()
        return self

    def estimate(self, value: int) -> int:
        """Lower bound on the true count; undercounts by at most total/k."""
        return self.counters.get(int(value), 0)

    @property
    def error_bound(self) -> float:
        return self.total / self.k

    def heavy_hitters(self, phi: float) -> dict[int, int]:
        """Candidates with estimated count >= (phi - 1/k) * total: guaranteed
        to include every item with true frequency > phi * total."""
        thresh = (phi - 1.0 / self.k) * self.total
        return {v: n for v, n in self.counters.items() if n >= thresh}

    def to_bytes(self) -> bytes:
        items = sorted(self.counters.items())
        head = struct.pack("<qqq", self.k, self.total, len(items))
        arr = np.array(items, dtype=np.int64).tobytes() if items else b""
        return head + arr

    @classmethod
    def from_bytes(cls, data: bytes) -> "MGSketch":
        k, total, n = struct.unpack_from("<qqq", data)
        sk = cls(k)
        sk.total = total
        if n:
            arr = np.frombuffer(data, dtype=np.int64, count=2 * n, offset=24).reshape(n, 2)
            sk.counters = {int(v): int(c) for v, c in arr}
        return sk
