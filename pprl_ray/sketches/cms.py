"""Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005).

depth x width counter matrix; row i uses an independent seeded hash. Point
query = min over rows; merge = counter-wise add (exactly order-invariant).
Published guarantee: overestimate ≤ εN with probability 1-δ for
ε = e/width, δ = e^-depth.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["CMSSketch"]


@register("cms")
class CMSSketch:
    def __init__(self, width: int = 1 << 16, depth: int = 5, seed: int = 0):
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        values = np.asarray(values)
        if counts is None:
            # pre-aggregate duplicates within the batch: one scatter per distinct
            values, counts = np.unique(values, return_counts=True)
        self.total += int(counts.sum())
        for d in range(self.depth):
            idx = (hash_ints(values, self.seed * 1_000_003 + d) % np.uint64(self.width)).astype(np.int64)
            np.add.at(self.table[d], idx, counts)

    def query(self, values: np.ndarray) -> np.ndarray:
        values = np.asarray(values)
        est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(self.depth):
            idx = (hash_ints(values, self.seed * 1_000_003 + d) % np.uint64(self.width)).astype(np.int64)
            np.minimum(est, self.table[d][idx], out=est)
        return est

    def merge(self, other: "CMSSketch") -> "CMSSketch":
        assert (self.width, self.depth, self.seed) == (other.width, other.depth, other.seed)
        self.table += other.table
        self.total += other.total
        return self

    def inner_product(self, other: "CMSSketch") -> int:
        """Join-size estimate |A ⋈ B| = Σ_k f_A(k)·f_B(k): min over rows of
        the row dot products (Cormode & Muthukrishnan 2005 §4.2). Never
        underestimates; overestimate ≤ ε·N_A·N_B with probability 1-δ.
        Both sketches must share (width, depth, seed)."""
        assert (self.width, self.depth, self.seed) == (other.width, other.depth, other.seed)
        dots = np.einsum("dw,dw->d", self.table, other.table)
        return int(dots.min())

    @property
    def epsilon(self) -> float:
        return float(np.e) / self.width

    @property
    def delta(self) -> float:
        return float(np.exp(-self.depth))

    _DTYPES = (np.uint8, np.uint16, np.uint32, np.int64)

    def to_bytes(self) -> bytes:
        # serialize with the smallest dtype that holds the max cell: partial
        # tables from one batch are tiny counts, so blobs shrink 4-8x (and
        # compress/decompress proportionally faster) vs always-int64
        mx = int(self.table.max()) if self.table.size else 0
        code = next(i for i, dt in enumerate(self._DTYPES) if mx <= np.iinfo(dt).max)
        return (
            struct.pack("<qqqqq", self.width, self.depth, self.seed, self.total, code)
            + self.table.astype(self._DTYPES[code]).tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CMSSketch":
        width, depth, seed, total, code = struct.unpack_from("<qqqqq", data)
        sk = cls.__new__(cls)
        sk.width, sk.depth, sk.seed, sk.total = width, depth, seed, total
        sk.table = (
            np.frombuffer(data[40:], dtype=cls._DTYPES[code])
            .reshape(depth, width)
            .astype(np.int64)
        )
        return sk
