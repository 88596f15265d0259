"""Corpus-level Bloom filter sketch (token presence), mergeable by bytes-OR.

This is the reference's CLK Bloom filter machinery
(``pprl_core/bits.py:67-79`` double hashing) lifted to a corpus-level
mergeable aggregate over int token ids: k probe positions per item via
double hashing of two independent splitmix64 streams (Kirsch & Mitzenmacher,
"Less Hashing, Same Performance", ESA 2006 — g_i(x) = h1(x) + i*h2(x)).

Published bounds used by the tests:
- false-positive rate after n insertions: ``(1 - e^{-kn/m})^k``
- fill-ratio cardinality estimate: ``n ≈ -(m/k) * ln(1 - X/m)``
  (Swamidass & Baldi 2007), X = number of set bits.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["BloomSketch"]

_POPCOUNT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint16)


@register("bloom")
class BloomSketch:
    """m-bit Bloom filter with k probes; merge = bitwise OR (exactly
    order-invariant and idempotent)."""

    def __init__(self, m_bits: int = 1 << 23, k: int = 4, seed: int = 0):
        self.m = int(m_bits)
        self.k = int(k)
        self.seed = int(seed)
        self.buf = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        h1 = hash_ints(values, self.seed)
        h2 = hash_ints(values, self.seed + 1) | np.uint64(1)  # odd increments
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            pos = (h1[None, :] + i * h2[None, :]) % np.uint64(self.m)
        return pos.ravel()

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        # set semantics: duplicates set the same bits — dedup before probing
        self.update_unique(np.unique(np.asarray(values)))

    def update_unique(self, values: np.ndarray) -> None:
        """Update with ALREADY-DEDUPLICATED values (duplicates are harmless
        but waste work)."""
        if len(values) == 0:
            return
        pos = self._positions(np.asarray(values))
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(128) >> (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        np.bitwise_or.at(self.buf, byte_idx, masks)

    def contains(self, values: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(values)).reshape(self.k, -1)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(128) >> (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        hits = (self.buf[byte_idx] & masks) != 0
        return hits.all(axis=0)

    def merge(self, other: "BloomSketch") -> "BloomSketch":
        assert (self.m, self.k, self.seed) == (other.m, other.k, other.seed)
        np.bitwise_or(self.buf, other.buf, out=self.buf)
        return self

    def bits_set(self) -> int:
        return int(_POPCOUNT_LUT[self.buf].sum())

    def estimate_cardinality(self) -> float:
        """Swamidass-Baldi fill-ratio estimator."""
        x = self.bits_set()
        if x >= self.m:
            return float("inf")
        return -(self.m / self.k) * float(np.log1p(-x / self.m))

    def fpr(self, n: int) -> float:
        """Theoretical false-positive rate after n insertions."""
        return float((1.0 - np.exp(-self.k * n / self.m)) ** self.k)

    def to_bytes(self) -> bytes:
        return struct.pack("<qqq", self.m, self.k, self.seed) + self.buf.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomSketch":
        m, k, seed = struct.unpack_from("<qqq", data)
        sk = cls.__new__(cls)
        sk.m, sk.k, sk.seed = m, k, seed
        sk.buf = np.frombuffer(data[24:], dtype=np.uint8).copy()
        return sk
