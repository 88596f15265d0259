"""SpaceSaving heavy-hitters summary (Metwally, Agrawal & El Abbadi,
"Efficient Computation of Frequent and Top-k Elements in Data Streams",
ICDT 2005; mergeable form per Agarwal et al., "Mergeable Summaries",
PODS 2012 §3) — the OVERESTIMATE-side complement of :class:`MGSketch`:

- every tracked count c(x) satisfies ``true(x) <= c(x) <= true(x) + e(x)``
  with the per-item error e(x) recorded explicitly, and ``e(x) <= N/k``;
- an UNTRACKED item's true count is bounded by the summary's floor (the
  largest count ever evicted), so ``estimate()`` is a valid upper bound
  for every item — MG's counts are lower bounds instead;
- any item with true count > N/k is guaranteed tracked.

Merge (PODS 2012): for each item in either summary, add its counts and
errors, an absent item contributing that summary's floor to BOTH (its
true count there is at most the floor); then keep the k largest counts
(deterministic (count desc, key asc) tie-break) and raise the floor to
the largest pruned count. Both invariants above are preserved under
arbitrary merge trees, with errors adding (property-tested). In the
exact regime (<= k distinct keys, no evictions anywhere) every count is
exact, every error zero, and the merge is bit-order-invariant — the
regime the SQL driver oracle pins, mirroring the MG ``heavy_hitters``
precedent.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register

__all__ = ["SpaceSavingSketch"]


@register("spacesaving")
class SpaceSavingSketch:
    def __init__(self, k: int = 256):
        self.k = int(k)
        self.counters: dict[int, tuple[int, int]] = {}  # key -> (count, err)
        self.floor = 0  # max count ever evicted/pruned (absent-item bound)
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
            v, n = int(v), int(n)
            if v in c:
                cnt, err = c[v]
                c[v] = (cnt + n, err)
            elif len(c) < self.k:
                c[v] = (n, 0)
            else:
                # evict the min-(count, key) counter; the newcomer inherits
                # its count as both offset and recorded error
                ev = min(c, key=lambda q: (c[q][0], q))
                m = c[ev][0]
                del c[ev]
                self.floor = max(self.floor, m)
                c[v] = (m + n, m)

    def merge(self, other: "SpaceSavingSketch") -> "SpaceSavingSketch":
        assert self.k == other.k
        f1, f2 = self.floor, other.floor
        merged: dict[int, tuple[int, int]] = {}
        for v in self.counters.keys() | other.counters.keys():
            c1, e1 = self.counters.get(v, (f1, f1))
            c2, e2 = other.counters.get(v, (f2, f2))
            merged[v] = (c1 + c2, e1 + e2)
        self.total += other.total
        self.floor = f1 + f2
        if len(merged) > self.k:
            keep = sorted(merged, key=lambda q: (-merged[q][0], q))[: self.k]
            pruned_max = max(
                merged[q][0] for q in merged.keys() - set(keep)
            )
            self.floor = max(self.floor, pruned_max)
            merged = {q: merged[q] for q in keep}
        self.counters = merged
        return self

    def estimate(self, value: int) -> int:
        """UPPER bound on the true count (MG's estimate lower-bounds)."""
        v = int(value)
        return self.counters[v][0] if v in self.counters else self.floor

    def guaranteed(self, value: int) -> int:
        """LOWER bound: count minus its recorded overestimation error."""
        v = int(value)
        if v not in self.counters:
            return 0
        cnt, err = self.counters[v]
        return cnt - err

    @property
    def error_bound(self) -> float:
        return self.total / self.k

    def heavy_hitters(self, phi: float) -> dict[int, int]:
        """Upper-bound counts >= phi*total: a guaranteed superset of items
        with true frequency > phi * total (true <= count)."""
        thresh = phi * self.total
        return {v: c for v, (c, _) in self.counters.items() if c >= thresh}

    def items(self) -> list[tuple[int, int, int]]:
        """(key, count, err) sorted by (count desc, key asc) — canonical."""
        return sorted(
            ((v, c, e) for v, (c, e) in self.counters.items()),
            key=lambda t: (-t[1], t[0]),
        )

    def to_bytes(self) -> bytes:
        items = sorted(self.counters.items())
        head = struct.pack("<qqqq", self.k, self.total, self.floor, len(items))
        arr = (
            np.array([(v, c, e) for v, (c, e) in items], dtype=np.int64).tobytes()
            if items else b""
        )
        return head + arr

    @classmethod
    def from_bytes(cls, data: bytes) -> "SpaceSavingSketch":
        k, total, floor, n = struct.unpack_from("<qqqq", data)
        sk = cls(k)
        sk.total, sk.floor = total, floor
        if n:
            arr = np.frombuffer(data, np.int64, 3 * n, 32).reshape(n, 3)
            sk.counters = {int(v): (int(c), int(e)) for v, c, e in arr}
        return sk
