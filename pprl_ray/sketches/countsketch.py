"""Count-Sketch (Charikar, Chen, Farach-Colton, ICALP 2002): the signed
counterpart of count-min. Each row hashes items to a bucket AND to a
random sign; the estimate is the MEDIAN over rows of sign * counter.

Unlike count-min (which only ever overestimates, by <= εN), count-sketch
is UNBIASED with variance ||f||₂²/width per row — much tighter on
heavy-tailed (zipfian) token streams where ||f||₂ << N, at the cost of
allowing underestimates. Merge = counter-wise add (exactly order- and
partitioning-invariant, the UDAF contract).

Published guarantee: |est - f(x)| <= 3·||f||₂/sqrt(width) with probability
>= 1 - δ for depth = O(log 1/δ) rows (median amplification).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["CountSketch"]


@register("countsketch")
class CountSketch:
    def __init__(self, width: int = 1 << 16, depth: int = 5, seed: int = 0):
        assert depth % 2 == 1, "odd depth: the estimator is a median over rows"
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    def _bucket_sign(self, values: np.ndarray, d: int) -> tuple[np.ndarray, np.ndarray]:
        h = hash_ints(values, self.seed * 1_000_003 + d)
        bucket = (h % np.uint64(self.width)).astype(np.int64)
        # top bit as the Rademacher sign: independent of the bucket bits
        # for width << 2^63
        sign = np.where((h >> np.uint64(63)) == 1, 1, -1).astype(np.int64)
        return bucket, sign

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        values = np.asarray(values)
        if counts is None:
            values, counts = np.unique(values, return_counts=True)
        self.total += int(counts.sum())
        for d in range(self.depth):
            bucket, sign = self._bucket_sign(values, d)
            np.add.at(self.table[d], bucket, sign * counts)

    def query(self, values: np.ndarray) -> np.ndarray:
        values = np.asarray(values)
        est = np.empty((self.depth, len(values)), dtype=np.int64)
        for d in range(self.depth):
            bucket, sign = self._bucket_sign(values, d)
            est[d] = sign * self.table[d][bucket]
        return np.median(est, axis=0).astype(np.int64)

    def merge(self, other: "CountSketch") -> "CountSketch":
        assert (self.width, self.depth, self.seed) == (other.width, other.depth, other.seed)
        self.table += other.table
        self.total += other.total
        return self

    def l2_error_bound(self, l2_norm: float) -> float:
        """|est - true| <= 3*l2/sqrt(width) w.h.p. (median over depth rows)."""
        return 3.0 * l2_norm / self.width**0.5

    # -- AMS readouts (Alon-Matias-Szegedy, STOC 1996) -------------------------
    # A CountSketch row IS an AMS sketch with bucketed sign-sums: the sum of
    # squared counters is an unbiased F2 (= self-join size) estimator with
    # variance <= 2*F2^2/width per row; the median over the odd `depth` rows
    # amplifies confidence. Exact-integer arithmetic (object dtype) so the
    # readout is bit-reproducible and SQL-replicable at any magnitude.

    def f2(self) -> int:
        """Second frequency moment Σ f(x)² — the self-join size."""
        ests = []
        for d in range(self.depth):
            row = self.table[d].astype(object)
            ests.append(int((row * row).sum()))
        return sorted(ests)[self.depth // 2]

    def inner_product(self, other: "CountSketch") -> int:
        """Unbiased ⟨f, g⟩ estimate (equi-join size between two streams) —
        median over rows of Σ_k A[d,k]·B[d,k]. Unlike the CMS inner product
        (an upper bound), this is unbiased and can under- or overestimate."""
        assert (self.width, self.depth, self.seed) == (other.width, other.depth, other.seed)
        ests = []
        for d in range(self.depth):
            a = self.table[d].astype(object)
            b = other.table[d].astype(object)
            ests.append(int((a * b).sum()))
        return sorted(ests)[self.depth // 2]

    def to_bytes(self) -> bytes:
        return (
            struct.pack("<qqqq", self.width, self.depth, self.seed, self.total)
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountSketch":
        width, depth, seed, total = struct.unpack_from("<qqqq", data)
        sk = cls.__new__(cls)
        sk.width, sk.depth, sk.seed, sk.total = width, depth, seed, total
        sk.table = np.frombuffer(data[32:], dtype=np.int64).reshape(depth, width).copy()
        return sk
