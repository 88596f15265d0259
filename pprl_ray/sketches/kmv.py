"""KMV (k-minimum-values / bottom-k) distinct-count sketch.

Beyer, Haas, Reinwald, Sismanis & Gemulla, "On Synopses for Distinct-Value
Estimation Under Multiset Operations" (SIGMOD 2007): keep the k smallest
64-bit hashes of the distinct values; with U_(k) the k-th smallest hash
normalised to (0,1], the unbiased estimator is (k-1)/U_(k) with relative
standard error ~= 1/sqrt(k-2).

Why it earns a slot next to HLL: the state is a SORTED SET of hashes, so
merge = set-union + bottom-k is exactly order/topology-invariant, the sketch
doubles as a uniform distinct-value SAMPLE (any fixed hash function makes
the bottom-k a coordinated sample, enabling cross-sketch set operations:
Jaccard via |A cap B over the union's bottom-k|), and — unlike HLL — the
whole estimator is integer arithmetic over splitmix64, so an external system
(our DuckDB oracles) can replicate the estimate EXACTLY in SQL, no pinning.

``estimate_int`` is the conformance path: ``((k-1) << 64) // h_k`` in exact
integer arithmetic, bit-identical to the SQL replica
(``__ray_entry__.oracle_sql()['kmv_distinct_custkeys']``). ``estimate``
is the float convenience wrapper.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["KMVSketch"]


@register("kmv")
class KMVSketch:
    def __init__(self, k: int = 256, seed: int = 0):
        assert k >= 4
        self.k = int(k)
        self.seed = int(seed)
        self.hashes = np.empty(0, dtype=np.uint64)  # sorted, <= k entries

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self.update_unique(np.unique(np.asarray(values)))

    def update_unique(self, values: np.ndarray) -> None:
        """Update with ALREADY-DEDUPLICATED values (the fused-profile
        shared-dedup path; duplicates are harmless but waste work)."""
        if len(values) == 0:
            return
        self._absorb(hash_ints(np.asarray(values), self.seed))

    def _absorb(self, h: np.ndarray) -> None:
        if len(self.hashes) == self.k:
            # prune before the union: only candidates below the current
            # k-th minimum can enter the bottom-k
            h = h[h < self.hashes[-1]]
            if len(h) == 0:
                return
        merged = np.union1d(self.hashes, h)  # sorted + deduplicated
        self.hashes = merged[: self.k]

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        assert (self.k, self.seed) == (other.k, other.seed)
        self._absorb(other.hashes)
        return self

    def estimate_int(self) -> int:
        """Exact-integer KMV estimate (the SQL-replicable conformance path)."""
        n = len(self.hashes)
        if n < self.k:
            return n  # saw fewer than k distinct values: exact
        return ((self.k - 1) << 64) // int(self.hashes[-1])

    def estimate(self) -> float:
        return float(self.estimate_int())

    def relative_error_bound(self) -> float:
        return 1.0 / (self.k - 2) ** 0.5

    def jaccard(self, other: "KMVSketch") -> float:
        """Coordinated-sample Jaccard estimate: fraction of the UNION's
        bottom-k present in both sketches (Beyer et al. SS4.2)."""
        assert (self.k, self.seed) == (other.k, other.seed)
        union = np.union1d(self.hashes, other.hashes)[: self.k]
        if len(union) == 0:
            return 0.0
        both = np.intersect1d(self.hashes, other.hashes, assume_unique=True)
        return float(np.isin(union, both, assume_unique=True).sum() / len(union))

    def to_bytes(self) -> bytes:
        return struct.pack("<qq", self.k, self.seed) + self.hashes.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "KMVSketch":
        k, seed = struct.unpack_from("<qq", data)
        sk = cls.__new__(cls)
        sk.k, sk.seed = k, seed
        sk.hashes = np.frombuffer(data[16:], dtype=np.uint64).copy()
        return sk
