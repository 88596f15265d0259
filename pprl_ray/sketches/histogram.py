"""Fixed-bin histogram as a mergeable UDAF.

Not an approximation: for a pre-declared [lo, hi) range and bin count, the
per-bin counts are EXACT, the merge is a counter-wise add (exactly order-
and partitioning-invariant), and the whole state is ``bins + 2`` int64s —
the cheapest possible distribution summary when the range is known up
front (token counts, document lengths, quality scores). Complements the
KLL/t-digest sketches, which trade exactness for not needing a range.

Bin rule (replicable in ANSI SQL, so histogram queries are fully
SQL-oracle-able): values below ``lo`` clamp into an underflow bucket,
values >= ``hi`` into an overflow bucket, else
``bin = floor((v - lo) * bins / (hi - lo))`` — integer arithmetic when
lo/hi/v are integers, so no float-boundary ambiguity.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register

__all__ = ["HistogramSketch"]


@register("histogram")
class HistogramSketch:
    def __init__(self, lo: int, hi: int, bins: int = 64):
        assert hi > lo and bins >= 1
        self.lo = int(lo)
        self.hi = int(hi)
        self.bins = int(bins)
        # [underflow, bin_0..bin_{bins-1}, overflow]
        self.counts = np.zeros(self.bins + 2, dtype=np.int64)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.asarray(values).astype(np.int64, copy=False)
        idx = (v - self.lo) * self.bins // (self.hi - self.lo) + 1
        idx = np.clip(idx, 0, self.bins + 1)
        idx[v < self.lo] = 0
        idx[v >= self.hi] = self.bins + 1
        self.counts += np.bincount(idx, minlength=self.bins + 2)

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        assert (self.lo, self.hi, self.bins) == (other.lo, other.hi, other.bins)
        self.counts += other.counts
        return self

    def to_bytes(self) -> bytes:
        return struct.pack("<qqq", self.lo, self.hi, self.bins) + self.counts.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HistogramSketch":
        lo, hi, bins = struct.unpack_from("<qqq", data)
        sk = cls.__new__(cls)
        sk.lo, sk.hi, sk.bins = lo, hi, bins
        sk.counts = np.frombuffer(data[24:], dtype=np.int64).copy()
        return sk

    # -- readout --------------------------------------------------------------

    def edges(self) -> np.ndarray:
        """bins+1 edges of the in-range buckets (float for readability)."""
        return self.lo + np.arange(self.bins + 1) * (self.hi - self.lo) / self.bins

    def bin_counts(self) -> np.ndarray:
        """The bins in-range counts (excluding under/overflow)."""
        return self.counts[1:-1]

    @property
    def underflow(self) -> int:
        return int(self.counts[0])

    @property
    def overflow(self) -> int:
        return int(self.counts[-1])

    def total(self) -> int:
        return int(self.counts.sum())
