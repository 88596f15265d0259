"""HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier 2007)
with the small-range linear-counting correction from the original paper and
the 64-bit-hash variant of Heule, Nunkesser & Hall ("HyperLogLog in
Practice", EDBT 2013, no large-range correction needed at 64 bits).

m = 2^p registers; merge = register-wise max (exactly order-invariant);
relative standard error ≈ 1.04 / sqrt(m).

Sparse representation (the same paper's HLL++ idea, simplified): until more
than m/8 registers are non-zero the state is a sorted (idx:int32, rho:uint8)
pair list instead of the dense m-byte array. This is a LOSSLESS encoding —
estimates, merges and serialized bytes are pure functions of register
content, so dense- and sparse-built sketches stay bit-identical — but it
cuts the per-sketch footprint ~25x at low fill. That is the difference
between 16 KiB and ~300 B per key in a per-key sketch table
(state/aggregate.sketch_by_key): a 10M-key table ships ~3 GB of blobs
through the shuffle instead of ~160 GB. Serialization picks the encoding
from the CONTENT (nnz <= m/8 -> sparse), never from how the sketch was
built, so merge topology cannot change the bytes; the two formats are
discriminated by length (dense is exactly 16+m bytes; sparse is
16+4+5*nnz < 16+m by construction), which keeps pre-sparse dense blobs
(older checkpoints) readable.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["HLLSketch"]

_SPARSE_FRAC = 8  # stay sparse while nnz <= m // _SPARSE_FRAC


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _pair_max(idx: np.ndarray, rho: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Collapse (idx, rho) pairs to max rho per idx, sorted by idx."""
    order = np.lexsort((rho, idx))
    idx_s, rho_s = idx[order], rho[order]
    last = np.r_[idx_s[1:] != idx_s[:-1], True] if len(idx_s) else np.empty(0, bool)
    return idx_s[last], rho_s[last]


@register("hll")
class HLLSketch:
    def __init__(self, p: int = 14, seed: int = 0):
        assert 4 <= p <= 18
        self.p = int(p)
        self.m = 1 << self.p
        self.seed = int(seed)
        self._dense: np.ndarray | None = None  # np.uint8[m] once densified
        self._sp_idx = np.empty(0, dtype=np.int32)  # sorted unique register idx
        self._sp_rho = np.empty(0, dtype=np.uint8)  # max rho at those idx

    # --- state access ------------------------------------------------------

    @property
    def registers(self) -> np.ndarray:
        """Dense register view (densifies a sparse sketch in place)."""
        if self._dense is None:
            self._densify()
        return self._dense

    def _densify(self) -> None:
        dense = np.zeros(self.m, dtype=np.uint8)
        if len(self._sp_idx):
            dense[self._sp_idx] = self._sp_rho
        self._dense = dense
        self._sp_idx = self._sp_rho = np.empty(0, dtype=np.uint8)

    def _nnz(self) -> int:
        if self._dense is not None:
            return int((self._dense != 0).sum())
        return len(self._sp_idx)

    # --- updates -----------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        # registers depend only on the distinct values: dedup first (zipf-ish
        # token batches dedup 10-20x, and np.unique is far cheaper than the
        # hash+clz pipeline on the duplicates)
        self.update_unique(np.unique(np.asarray(values)))

    def _hash_rho(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = hash_ints(values, self.seed)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int32)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)  # sentinel low bits
        # rho = count of leading zeros in the remaining 64-p bits, + 1
        lz = np.zeros(len(h), dtype=np.uint8)
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
        return idx, rho

    def update_unique(self, values: np.ndarray) -> None:
        """Update with ALREADY-DEDUPLICATED values (caller guarantees
        uniqueness; duplicates are harmless but waste work)."""
        if len(values) == 0:
            return
        # a large update lands dense anyway: densify BEFORE hashing so the
        # hot path is the plain np.maximum.at scatter, not the sparse
        # concat+lexsort (which is only a win for genuinely small updates)
        if self._dense is None and len(values) > self.m // _SPARSE_FRAC:
            self._densify()
        idx, rho = self._hash_rho(values)
        if self._dense is not None:
            np.maximum.at(self._dense, idx, rho)
            return
        self._absorb_pairs(idx, rho)

    def _absorb_pairs(self, idx: np.ndarray, rho: np.ndarray) -> None:
        sp_idx, sp_rho = _pair_max(
            np.concatenate([self._sp_idx.astype(np.int32), idx]),
            np.concatenate([self._sp_rho.astype(np.uint8), rho]),
        )
        if len(sp_idx) > self.m // _SPARSE_FRAC:
            self._sp_idx, self._sp_rho = sp_idx, sp_rho
            self._densify()
        else:
            self._sp_idx, self._sp_rho = sp_idx.astype(np.int32), sp_rho

    # --- merge / estimate ---------------------------------------------------

    def merge(self, other: "HLLSketch") -> "HLLSketch":
        assert (self.p, self.seed) == (other.p, other.seed)
        if self._dense is None and other._dense is None:
            self._absorb_pairs(other._sp_idx.astype(np.int32), other._sp_rho)
        else:
            np.maximum(self.registers, other.registers, out=self._dense)
        return self

    def estimate(self) -> float:
        m = self.m
        if self._dense is not None:
            inv_sum = float(np.power(2.0, -self._dense.astype(np.float64)).sum())
            zeros = int((self._dense == 0).sum())
        else:
            # stored rho >= 1 always, so zeros = untouched registers exactly
            zeros = m - len(self._sp_idx)
            inv_sum = float(zeros) + float(
                np.power(2.0, -self._sp_rho.astype(np.float64)).sum()
            )
        e = _alpha(m) * m * m / inv_sum
        if e <= 2.5 * m and zeros:
            return m * float(np.log(m / zeros))  # linear counting
        return float(e)

    def relative_error_bound(self) -> float:
        return 1.04 / (self.m**0.5)

    # --- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        """Canonical bytes: encoding chosen from register content alone
        (sparse iff nnz <= m/8), so any build/merge topology that reaches
        the same registers produces identical bytes."""
        header = struct.pack("<qq", self.p, self.seed)
        nnz = self._nnz()
        if nnz <= self.m // _SPARSE_FRAC:
            if self._dense is not None:
                idx = np.flatnonzero(self._dense).astype(np.int32)
                rho = self._dense[idx]
            else:
                idx, rho = self._sp_idx, self._sp_rho
            return header + struct.pack("<I", nnz) + idx.tobytes() + rho.tobytes()
        return header + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HLLSketch":
        p, seed = struct.unpack_from("<qq", data)
        sk = cls.__new__(cls)
        sk.p, sk.seed = p, seed
        sk.m = 1 << p
        if len(data) == 16 + sk.m:  # dense (also the only pre-sparse format)
            sk._dense = np.frombuffer(data[16:], dtype=np.uint8).copy()
            sk._sp_idx = sk._sp_rho = np.empty(0, dtype=np.uint8)
        else:
            (nnz,) = struct.unpack_from("<I", data, 16)
            off = 20
            sk._dense = None
            sk._sp_idx = np.frombuffer(data[off : off + 4 * nnz], dtype=np.int32).copy()
            sk._sp_rho = np.frombuffer(
                data[off + 4 * nnz : off + 5 * nnz], dtype=np.uint8
            ).copy()
        return sk
