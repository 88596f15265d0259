"""HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier 2007)
with the small-range linear-counting correction from the original paper and
the 64-bit-hash variant of Heule, Nunkesser & Hall ("HyperLogLog in
Practice", EDBT 2013, no large-range correction needed at 64 bits).

m = 2^p registers; merge = register-wise max (exactly order-invariant);
relative standard error ≈ 1.04 / sqrt(m).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["HLLSketch"]


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@register("hll")
class HLLSketch:
    def __init__(self, p: int = 14, seed: int = 0):
        assert 4 <= p <= 18
        self.p = int(p)
        self.m = 1 << self.p
        self.seed = int(seed)
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        # registers depend only on the distinct values: dedup first (zipf-ish
        # token batches dedup 10-20x, and np.unique is far cheaper than the
        # hash+clz pipeline on the duplicates)
        self.update_unique(np.unique(np.asarray(values)))

    def update_unique(self, values: np.ndarray) -> None:
        """Update with ALREADY-DEDUPLICATED values (caller guarantees
        uniqueness; duplicates are harmless but waste work)."""
        if len(values) == 0:
            return
        h = hash_ints(values, self.seed)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)  # sentinel low bits
        # rho = count of leading zeros in the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        # vectorised CLZ via float64 log2 would lose precision; use a
        # shift-halving loop (6 iterations, all vector ops)
        shift = 32
        while shift >= 1:
            zero_top = (cur >> np.uint64(64 - shift)) == 0
            lz[zero_top] += shift
            cur[zero_top] = cur[zero_top] << np.uint64(shift)
            shift //= 2
        rho = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        assert (self.p, self.seed) == (other.p, other.seed)
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = _alpha(m) * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * float(np.log(m / zeros))  # linear counting
        return float(e)

    def relative_error_bound(self) -> float:
        return 1.04 / (self.m**0.5)

    def to_bytes(self) -> bytes:
        return struct.pack("<qq", self.p, self.seed) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HLLSketch":
        p, seed = struct.unpack_from("<qq", data)
        sk = cls.__new__(cls)
        sk.p, sk.seed = p, seed
        sk.m = 1 << p
        sk.registers = np.frombuffer(data[16:], dtype=np.uint8).copy()
        return sk
