"""Tuple sketch: a theta sketch whose retained keys carry an ADDITIVE
summary — the Apache-DataSketches "tuple sketch" idea (theta framework:
Dasgupta, Lang, Rhodes, Thaler, EDBT 2016), implemented from the papers'
math on numpy; no code reused.

Where :class:`ThetaSketch` answers "how many distinct keys", the tuple
sketch answers "what is Σ f(key) over the distinct keys" for an additive
per-key aggregate f (here: the SUM of an int64 payload over every
re-observation of the key), from the same bounded uniform hash-space
sample: each distinct key survives with probability theta/2^64, so the
Horvitz-Thompson estimate ``Σ_retained summary / (theta/2^64)`` is
unbiased for the population total — the keyed-sum readout a 100-TB
corpus uses to price "total tokens over distinct documents per shard"
without a full groupby.

State invariant (the theta canonical-form argument carried over):
``keys`` holds ALL distinct key-hashes of the full stream below
``theta``, and ``summaries[i]`` is the COMPLETE aggregated payload of
that key over the full stream. A key below the final theta survives
every intermediate cut, and its summary is a commutative sum — so
merges are exactly topology- and order-invariant, bit-for-bit
(property-tested), and the fixed-point integer readouts are
SQL-replicable via the splitmix64 limb CTEs (house oracle style).

Exact mode (theta still 2^64): the retained set IS the distinct-key set
and every estimate is exact.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["TupleSketch"]

_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)
_SPACE = 1 << 64


@register("tuple")
class TupleSketch:
    def __init__(self, k: int = 4096, seed: int = 0):
        assert k >= 16
        self.k = int(k)
        self.seed = int(seed)
        self.theta = _FULL
        self.keys = np.empty(0, dtype=np.uint64)
        self.summaries = np.empty(0, dtype=np.int64)

    # -- building -----------------------------------------------------------

    def update(self, values: np.ndarray, payloads: np.ndarray) -> None:
        """Absorb (key, payload) observations; a key's payloads SUM across
        all its observations (within and across batches/merges)."""
        if len(values) == 0:
            return
        h = hash_ints(np.asarray(values), self.seed)
        # per-batch combine: one (hash, summed payload) row per distinct key
        uh, inv = np.unique(h, return_inverse=True)
        sums = np.zeros(len(uh), dtype=np.int64)
        np.add.at(sums, inv, np.asarray(payloads, dtype=np.int64))
        keep = uh < self.theta
        self._absorb(uh[keep], sums[keep])

    def _absorb(self, keys: np.ndarray, sums: np.ndarray) -> None:
        if len(keys) == 0:
            return
        allk = np.concatenate([self.keys, keys])
        alls = np.concatenate([self.summaries, sums])
        uk, inv = np.unique(allk, return_inverse=True)
        us = np.zeros(len(uk), dtype=np.int64)
        np.add.at(us, inv, alls)
        self.theta, self.keys, self.summaries = self._canonical(self.theta, uk, us)

    def _canonical(self, theta: np.uint64, keys: np.ndarray, sums: np.ndarray):
        """Same cut rule as ThetaSketch._canonical (see its docstring for
        why this yields exact topology invariance)."""
        n = len(keys)
        if n > self.k or (theta != _FULL and n >= self.k):
            theta = keys[self.k - 1]
            keys, sums = keys[: self.k - 1], sums[: self.k - 1]
        return theta, keys, sums

    # -- UDAF contract ------------------------------------------------------

    def merge(self, other: "TupleSketch") -> "TupleSketch":
        assert (self.k, self.seed) == (other.k, other.seed)
        t = min(self.theta, other.theta)
        allk = np.concatenate([self.keys, other.keys])
        alls = np.concatenate([self.summaries, other.summaries])
        uk, inv = np.unique(allk, return_inverse=True)
        us = np.zeros(len(uk), dtype=np.int64)
        np.add.at(us, inv, alls)
        keep = uk < t
        self.theta, self.keys, self.summaries = self._canonical(
            t, uk[keep], us[keep]
        )
        return self

    def to_bytes(self) -> bytes:
        return (
            struct.pack("<qqQq", self.k, self.seed, int(self.theta), len(self.keys))
            + self.keys.tobytes()
            + self.summaries.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TupleSketch":
        k, seed, theta, n = struct.unpack_from("<qqQq", data)
        sk = cls.__new__(cls)
        sk.k, sk.seed, sk.theta = k, seed, np.uint64(theta)
        off = 32
        sk.keys = np.frombuffer(data, np.uint64, n, off).copy()
        sk.summaries = np.frombuffer(data, np.int64, n, off + 8 * n).copy()
        return sk

    # -- estimators ---------------------------------------------------------

    def is_exact(self) -> bool:
        return self.theta == _FULL

    def distinct_estimate_u(self) -> int:
        """Fixed-point distinct-key estimate (exact int arithmetic,
        SQL-replicable): exact count in exact mode, else
        ``(k-1) * 2^64 // theta`` (the retained count is always k-1 in
        estimation mode, by the canonical form)."""
        if self.is_exact():
            return len(self.keys)
        return (len(self.keys) * _SPACE) // int(self.theta)

    def sum_estimate_u(self) -> int:
        """Fixed-point Horvitz-Thompson estimate of Σ summary over ALL
        distinct keys: exact total in exact mode, else
        ``Σ_retained summary * 2^64 // theta`` (exact big-int floor)."""
        s = int(self.summaries.sum())
        if self.is_exact():
            return s
        return (s * _SPACE) // int(self.theta)

    def relative_error_bound(self) -> float:
        return 1.0 / np.sqrt(self.k - 2)

    def intersect_estimates_u(self, other: "TupleSketch") -> tuple[int, int]:
        """Coordinated-sample intersection readouts against ``other``
        (same k/seed): ``(shared_distinct_u, shared_sum_u)`` — the
        estimated number of keys present in BOTH populations, and the
        estimated Σ of THIS sketch's summaries over those shared keys.
        Both sketches sample by the SAME hash, so a key below
        ``t = min(theta_a, theta_b)`` is retained by both iff it is in
        both populations (the theta-framework intersection estimator);
        Horvitz-Thompson with rate t/2^64 gives exact-integer fixed-point
        estimates, exact when both sketches are exact."""
        assert (self.k, self.seed) == (other.k, other.seed)
        t = min(self.theta, other.theta)
        mine = self.keys < t
        common = np.intersect1d(self.keys[mine], other.keys[other.keys < t])
        s = int(self.summaries[np.isin(self.keys, common)].sum())
        if self.is_exact() and other.is_exact():
            return len(common), s
        return (
            (len(common) * _SPACE) // int(t),
            (s * _SPACE) // int(t),
        )

    def filtered_sum_u(self, min_summary: int) -> int:
        """Estimate of Σ summary over distinct keys whose TOTAL summary is
        >= min_summary — only valid in exact mode or as an approximation
        (a retained key's summary is its complete total, so the filter is
        exact on the sample)."""
        s = int(self.summaries[self.summaries >= min_summary].sum())
        if self.is_exact():
            return s
        return (s * _SPACE) // int(self.theta)
