"""Theta / KMV (k-minimum-values) distinct sketch with set-operation
estimators (union / intersection / Jaccard) between sketches.

Public background: Bar-Yossef, Jayram, Kumar, Sivakumar, Trevisan,
"Counting distinct elements in a data stream" (RANDOM 2002) for KMV;
Dasgupta, Lang, Rhodes, Thaler, "A framework for estimating stream
expression cardinalities" (EDBT 2016) and the Apache DataSketches theta
design for the generalized theta set-operation algebra. No code reused —
implemented from the papers' math on numpy.

State: the set of retained hash values — the (at most) ``k`` smallest
DISTINCT 64-bit hashes seen, kept sorted. ``theta`` is the sampling
threshold: 2^64 (i.e. "keep everything") while fewer than ``k`` distinct
hashes have been retained, else the k-th smallest hash value. Every
retained hash is < theta, so the retained set is a uniform hash-space
sample at rate theta/2^64.

Estimators (with ``theta_frac = theta / 2**64``):

- distinct:     ``len(retained) / theta_frac`` in estimation mode
                (equivalently ``(k-1) / frac(h_k)``), EXACT while the sketch
                has never been full (theta still 2^64).
- union(a, b):  combine retained sets, cut to ``min(theta_a, theta_b)``
                (and re-cap at k): standard theta union.
- intersect:    ``t = min(theta_a, theta_b)``; count hashes present in BOTH
                retained sets below ``t``; estimate ``count / frac(t)``.
- jaccard:      intersection estimate / union estimate over the SAME
                threshold ``t`` (the ratio estimator of the theta framework).

Merge (union) is a pure set operation on deterministic hashes — exactly
order- and partitioning-invariant, so merged results are bit-reproducible
at any ``num_cpus`` (the UDAF contract; property-tested). Relative standard
error of the distinct estimate is ~ ``1 / sqrt(k - 2)``.

Reference parity: generalizes the reference's exact attribute-value
statistics (``packages/pprl_client/pprl_client/lib.py:133-162``) to
bounded-memory distinct counting with set algebra, which the reference
computes exactly and in-memory only.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["ThetaSketch"]

_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)  # theta = 2^64 - 1 ≈ "keep everything"
_SPACE = float(2**64)


@register("theta")
class ThetaSketch:
    def __init__(self, k: int = 4096, seed: int = 0):
        assert k >= 16
        self.k = int(k)
        self.seed = int(seed)
        self.theta = _FULL
        self.retained = np.empty(0, dtype=np.uint64)

    # -- building -----------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self.update_unique(np.unique(np.asarray(values)))

    def update_unique(self, values: np.ndarray) -> None:
        """Absorb ALREADY-DEDUPLICATED values (duplicates are harmless —
        retained is a set — but waste hashing work)."""
        if len(values) == 0:
            return
        h = hash_ints(values, self.seed)
        self._absorb(h[h < self.theta])

    def _absorb(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        merged = np.union1d(self.retained, hashes)  # sorted distinct
        self.theta, self.retained = self._canonical(self.theta, merged)

    def _canonical(self, theta: np.uint64, sorted_set: np.ndarray):
        """Canonical (theta, retained) state — the key to EXACT topology
        invariance. Invariant: ``retained`` is ALL distinct hashes of the
        full stream below ``theta``. Exact mode (theta=2^64): cut only when
        len > k (exactly-k-distinct streams stay exact). Estimation mode
        (theta < 2^64, which certifies the global stream has > k distinct):
        cut when len >= k, so the state always collapses to (global k-th
        smallest hash, the k-1 below it) no matter how the stream was
        partitioned — when len lands at k-1 without a cut, theta is already
        provably the global k-th smallest hash (see tests/test_theta.py)."""
        n = len(sorted_set)
        if n > self.k or (theta != _FULL and n >= self.k):
            theta = sorted_set[self.k - 1]
            sorted_set = sorted_set[: self.k - 1]
        return theta, sorted_set

    # -- UDAF contract ------------------------------------------------------

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """Exactly topology-invariant: every hash below the final theta
        survives every intermediate cut (cuts only discard hashes >= the
        lowered theta), so ``_canonical`` always lands on the same state —
        (global k-th smallest hash, the k-1 hashes below it), or the exact
        distinct set while the global stream never exceeded k — regardless
        of partition boundaries or merge order (property-tested)."""
        assert (self.k, self.seed) == (other.k, other.seed)
        t = min(self.theta, other.theta)
        both = np.union1d(self.retained, other.retained)
        self.theta, self.retained = self._canonical(t, both[both < t])
        return self

    def to_bytes(self) -> bytes:
        return (
            struct.pack("<qqQ", self.k, self.seed, int(self.theta))
            + self.retained.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        k, seed, theta = struct.unpack_from("<qqQ", data)
        sk = cls.__new__(cls)
        sk.k, sk.seed, sk.theta = k, seed, np.uint64(theta)
        sk.retained = np.frombuffer(data[24:], dtype=np.uint64).copy()
        return sk

    # -- estimators ---------------------------------------------------------

    @property
    def _theta_frac(self) -> float:
        return float(self.theta) / _SPACE if self.theta != _FULL else 1.0

    def is_exact(self) -> bool:
        """True while the sketch never filled: retained IS the distinct set."""
        return self.theta == _FULL

    def estimate(self) -> float:
        return len(self.retained) / self._theta_frac

    def relative_error_bound(self) -> float:
        return 1.0 / max(self.k - 2, 1) ** 0.5

    # -- set algebra (between two compatible sketches) ----------------------

    @staticmethod
    def _common_threshold(a: "ThetaSketch", b: "ThetaSketch") -> np.uint64:
        assert (a.k, a.seed) == (b.k, b.seed)
        return min(a.theta, b.theta)

    def union_estimate(self, other: "ThetaSketch") -> float:
        t = self._common_threshold(self, other)
        both = np.union1d(self.retained, other.retained)
        t, both = self._canonical(t, both[both < t])
        frac = float(t) / _SPACE if t != _FULL else 1.0
        return len(both) / frac

    def intersection_estimate(self, other: "ThetaSketch") -> float:
        t = self._common_threshold(self, other)
        common = np.intersect1d(self.retained, other.retained)
        common = common[common < t]
        frac = float(t) / _SPACE if t != _FULL else 1.0
        return len(common) / frac

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """A-NOT-B estimate |self \\ other| at the common threshold
        (the canonical theta set-difference readout): count of self's
        retained hashes below t that other did not retain, scaled by the
        sampling fraction. Exact when both sketches are exact (bijective
        hash => set relations over hashes equal set relations over
        values)."""
        t = self._common_threshold(self, other)
        a = self.retained[self.retained < t]
        only = np.setdiff1d(a, other.retained, assume_unique=True)
        frac = float(t) / _SPACE if t != _FULL else 1.0
        return len(only) / frac

    def jaccard_estimate(self, other: "ThetaSketch") -> float:
        """|A ∩ B| / |A ∪ B| ratio estimator at the common threshold.

        Uses the raw (uncapped) union count below ``t`` so numerator and
        denominator share the same sample — exact when both sketches are
        exact."""
        t = self._common_threshold(self, other)
        a = self.retained[self.retained < t]
        b = other.retained[other.retained < t]
        union = len(np.union1d(a, b))
        if union == 0:
            return 0.0
        return len(np.intersect1d(a, b)) / union
