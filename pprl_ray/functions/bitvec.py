"""Bit-vector primitives, bit-for-bit compatible with the reference's
``bitarray``-based semantics (``/root/reference/packages/pprl_core/pprl_core/bits.py``)
but implemented on numpy packed ``uint8`` buffers so whole Arrow batches can be
processed vectorised.

Layout contract: bit ``i`` lives in byte ``i // 8`` at bit position
``7 - (i % 8)`` (MSB-first), which is exactly what ``bitarray.tobytes()``
produces (reference ``bits.py:158``) and what ``np.packbits(..., bitorder="big")``
emits. Base64 round-trips are therefore byte-identical with the reference.

A bit vector is represented either *packed* (``np.uint8`` buffer + explicit
``nbits``) or *unpacked* (``np.uint8`` 0/1 array of length ``nbits``).
Batch operations work on 2-D unpacked matrices (rows x nbits).
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

import numpy as np

__all__ = [
    "BitVec",
    "zeros",
    "from_01",
    "to_01",
    "fold_indices",
    "set_indices",
    "test_index",
    "popcount_bytes",
    "to_bytes",
    "to_base64",
    "from_base64",
    "optimal_size",
    "pack_rows",
    "unpack_rows",
]

# Lookup table: byte value -> number of set bits. Used for vectorised popcounts.
_POPCOUNT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint16)


@dataclass
class BitVec:
    """A packed bit vector: ``buf`` is MSB-first packed bytes, ``nbits`` the
    logical length (trailing pad bits in the last byte are always zero)."""

    buf: np.ndarray  # uint8
    nbits: int

    def copy(self) -> "BitVec":
        return BitVec(self.buf.copy(), self.nbits)

    def unpack(self) -> np.ndarray:
        return np.unpackbits(self.buf, count=self.nbits, bitorder="big")

    def count(self) -> int:
        return int(_POPCOUNT_LUT[self.buf].sum())

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, BitVec)
            and self.nbits == other.nbits
            and np.array_equal(self.buf, other.buf)
        )


def zeros(nbits: int) -> BitVec:
    """All-zero vector of ``nbits`` bits (reference ``bitarray(n)`` as used by
    the mask endpoints, ``routers/mask.py:219``)."""
    return BitVec(np.zeros((nbits + 7) // 8, dtype=np.uint8), nbits)


def from_01(bits: str) -> BitVec:
    arr = np.frombuffer(bits.encode(), dtype=np.uint8) - ord("0")
    return BitVec(np.packbits(arr, bitorder="big"), len(bits))


def to_01(bv: BitVec) -> str:
    return "".join("1" if b else "0" for b in bv.unpack())


def fold_indices(raw: np.ndarray, nbits: int) -> np.ndarray:
    """Reference ``_compute_idx`` (``bits.py:20-37``): negative ints are
    bit-flipped (``~i``), then taken mod ``nbits``. Vectorised: numpy
    ``~x == -x - 1`` matches CPython's ``~`` for int64."""
    raw = np.asarray(raw, dtype=np.int64)
    folded = np.where(raw < 0, ~raw, raw)
    return (folded % nbits).astype(np.int64)


def set_indices(bv: BitVec, idx: np.ndarray) -> None:
    """Set already-folded indices in a packed vector."""
    if len(idx) == 0:
        return
    byte_idx = idx >> 3
    masks = (np.uint8(128) >> (idx & 7).astype(np.uint8)).astype(np.uint8)
    np.bitwise_or.at(bv.buf, byte_idx, masks)


def test_index(bv: BitVec, i: int) -> bool:
    i = int(i)
    if i < 0:
        i = ~i
    i %= bv.nbits
    return bool(bv.buf[i >> 3] & (128 >> (i & 7)))


def popcount_bytes(buf: np.ndarray) -> int:
    return int(_POPCOUNT_LUT[buf].sum())


def to_bytes(bv: BitVec) -> bytes:
    return bv.buf.tobytes()


def to_base64(bv: BitVec) -> str:
    """Reference ``to_base64`` (``bits.py:148-158``): base64 of the MSB-first
    packed bytes."""
    return base64.b64encode(bv.buf.tobytes()).decode()


def from_base64(b64str: str) -> BitVec:
    """Reference ``from_base64`` (``bits.py:161-175``): the bit length becomes
    the next multiple of 8 (byte granularity), matching ``bitarray.frombytes``."""
    raw = base64.b64decode(b64str.encode())
    buf = np.frombuffer(raw, dtype=np.uint8).copy()
    return BitVec(buf, len(raw) * 8)


def optimal_size(p: float, n: float) -> int:
    """Reference ``optimal_size`` (``bits.py:127-145``): smallest filter size
    such that fraction ``p`` of bits are set after ``n`` insertions."""
    import math

    if n <= 0:
        raise ValueError(f"amount of expected insertions must be positive, is {n}")
    if p < 0 or p >= 1:
        raise ValueError(f"percentage of set bits must be in range of [0,1), is {p}")
    return int(math.ceil(1 / (1 - math.pow(p, 1 / n))))


# ---------------------------------------------------------------------------
# Batch (2-D) helpers: rows x nbits unpacked matrices


def unpack_rows(bufs: list[bytes] | np.ndarray, nbits: int) -> np.ndarray:
    """Unpack a list of equal-length packed buffers into a (rows, nbits) 0/1
    uint8 matrix."""
    if isinstance(bufs, np.ndarray) and bufs.dtype == np.uint8 and bufs.ndim == 2:
        mat = bufs
    else:
        nbytes = (nbits + 7) // 8
        flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        mat = flat.reshape(len(bufs), nbytes)
    return np.unpackbits(mat, axis=1, count=nbits, bitorder="big")


def pack_rows(bits: np.ndarray) -> np.ndarray:
    """Pack a (rows, nbits) 0/1 matrix into a (rows, nbytes) uint8 matrix."""
    return np.packbits(bits, axis=1, bitorder="big")
