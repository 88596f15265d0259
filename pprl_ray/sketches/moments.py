"""Exact central-moment aggregate (count + power sums) as a mergeable UDAF.

Not an approximation: the state is the exact integer power sums
``(n, Σx, Σx², Σx³, Σx⁴)`` over an integer-valued column, the merge is
entrywise addition (exactly order/partitioning-invariant), and every
downstream statistic — mean, variance, skewness, excess kurtosis — is a
deterministic float function of the exact integers, so the whole readout
is bit-reproducible under any topology AND replicable in plain SQL
(``SUM(x*x)`` etc.). Complements the KLL/t-digest sketches: those answer
rank queries within a bound; this answers moment queries exactly.

Python ints back the accumulators (arbitrary precision), so there is no
overflow cliff: Σx⁴ of 10^12 rows of 16-bit values ≈ 10^31 still merges
exactly; ``to_bytes`` carries the ints length-prefixed. Per-batch
accumulation is vectorised (int64 partial sums with an object-dtype
fallback above the safe range).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register

__all__ = ["MomentsSketch"]

# |x| below this keeps x^4 * len(batch) inside int64 for any batch under
# ~2e6 rows: 55108^4 * 2e6 < 2^63 is false — the exact bound is checked
# per batch against the true max|x| and batch length instead.
_I64_MAX = (1 << 63) - 1


@register("moments")
class MomentsSketch:
    def __init__(self) -> None:
        self.n = 0
        self.s1 = 0
        self.s2 = 0
        self.s3 = 0
        self.s4 = 0

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        v = np.asarray(values)
        if v.dtype.kind == "f":
            raise TypeError("MomentsSketch is exact over integer columns only")
        v = v.astype(np.int64, copy=False)
        amax = int(np.abs(v).max())
        # vectorised int64 power sums when provably overflow-free, else
        # exact object-int arithmetic (rare: |x| >= ~55k in huge batches)
        if amax > 0 and amax**4 * len(v) <= _I64_MAX:
            v2 = v * v
            self.n += len(v)
            self.s1 += int(v.sum())
            self.s2 += int(v2.sum())
            self.s3 += int((v2 * v).sum())
            self.s4 += int((v2 * v2).sum())
        else:
            vo = v.astype(object)
            v2 = vo * vo
            self.n += len(v)
            self.s1 += int(vo.sum())
            self.s2 += int(v2.sum())
            self.s3 += int((v2 * vo).sum())
            self.s4 += int((v2 * v2).sum())

    def merge(self, other: "MomentsSketch") -> "MomentsSketch":
        self.n += other.n
        self.s1 += other.s1
        self.s2 += other.s2
        self.s3 += other.s3
        self.s4 += other.s4
        return self

    # -- readout (deterministic floats over exact ints) -----------------------

    def mean(self) -> float:
        return self.s1 / self.n

    def variance(self) -> float:
        """Population variance: E[x²] − E[x]²  =  (n·Σx² − (Σx)²) / n²."""
        return (self.n * self.s2 - self.s1 * self.s1) / (self.n * self.n)

    def skewness(self) -> float:
        """Population skewness via exact integer central power sums:
        m3 = (n²·Σx³ − 3n·Σx·Σx² + 2(Σx)³) / n³, skew = m3 / m2^1.5."""
        n, s1, s2, s3 = self.n, self.s1, self.s2, self.s3
        m2_num = n * s2 - s1 * s1  # n² · m2
        m3_num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1**3  # n³ · m3
        if m2_num == 0:
            return 0.0
        return (m3_num / n**3) / (m2_num / (n * n)) ** 1.5

    def kurtosis_excess(self) -> float:
        """Population excess kurtosis: m4/m2² − 3, m4 from exact sums."""
        n, s1, s2, s3, s4 = self.n, self.s1, self.s2, self.s3, self.s4
        m2_num = n * s2 - s1 * s1
        m4_num = (
            n**3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1**4
        )  # n⁴ · m4
        if m2_num == 0:
            return -3.0
        return (m4_num / n**4) / (m2_num / (n * n)) ** 2 - 3.0

    # -- serialization (length-prefixed big-endian ints, sign byte) ----------

    @staticmethod
    def _pack_int(x: int) -> bytes:
        sign = 1 if x < 0 else 0
        mag = (-x if sign else x).to_bytes(max((abs(x).bit_length() + 7) // 8, 1), "big")
        return struct.pack("<BI", sign, len(mag)) + mag

    @staticmethod
    def _unpack_int(data: bytes, off: int) -> tuple[int, int]:
        sign, ln = struct.unpack_from("<BI", data, off)
        off += 5
        mag = int.from_bytes(data[off : off + ln], "big")
        return (-mag if sign else mag), off + ln

    def to_bytes(self) -> bytes:
        out = [struct.pack("<q", self.n)]
        for x in (self.s1, self.s2, self.s3, self.s4):
            out.append(self._pack_int(x))
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MomentsSketch":
        sk = cls()
        (sk.n,) = struct.unpack_from("<q", data)
        off = 8
        sk.s1, off = cls._unpack_int(data, off)
        sk.s2, off = cls._unpack_int(data, off)
        sk.s3, off = cls._unpack_int(data, off)
        sk.s4, off = cls._unpack_int(data, off)
        return sk
