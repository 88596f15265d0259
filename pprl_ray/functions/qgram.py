"""Tokenisation and digest-to-bit-index kernels.

Replicates the reference semantics exactly:

- ``tokenize`` — padded q-gram *set* (``pprl_core/common.py:9-28``)
- ``destructure_digest`` — first 16 digest bytes as four little-endian int32
  (``pprl_core/common.py:31-43``)
- hash-function chains (md5/sha1/sha256/sha512, plain + HMAC, chained
  digest-of-digest) — ``pprl_service/routers/mask.py:22-75``
- the four index strategies (double / triple / enhanced double / random) with
  the exact int-mixing contract of ``routers/mask.py:139-161`` and the index
  folding of ``pprl_core/bits.py:20-37``.

``indices_for_value`` is the per-token inner kernel: it returns the folded bit
indices a hashed string sets in a filter of ``nbits`` bits. Results are pure
functions of (value, config) and therefore cacheable per worker.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import struct
from random import Random
from typing import Callable, Sequence

import numpy as np

from .bitvec import fold_indices

__all__ = [
    "tokenize",
    "destructure_digest",
    "resolve_hash_fn",
    "indices_for_value",
    "HASH_ALGORITHMS",
    "HASH_STRATEGIES",
]

HASH_ALGORITHMS = ("md5", "sha1", "sha256", "sha512")
HASH_STRATEGIES = ("double_hash", "triple_hash", "enhanced_double_hash", "random_hash")

_HASHLIB = {
    "md5": hashlib.md5,
    "sha1": hashlib.sha1,
    "sha256": hashlib.sha256,
    "sha512": hashlib.sha512,
}


def tokenize(value: str, q: int = 2, padding: str = "_") -> set[str]:
    """Padded q-gram set (deduplicated), reference ``common.py:9-28``."""
    pad = (q - 1) * padding
    value = pad + value + pad
    return {value[i : i + q] for i in range(len(value) - q + 1)}


def destructure_digest(digest: bytes) -> tuple[int, int, int, int]:
    """First 16 bytes -> four little-endian int32 (``common.py:31-43``)."""
    return struct.unpack_from("<iiii", digest)


def resolve_hash_fn(algorithms: Sequence[str], key: str | None = None) -> Callable[[bytes], bytes]:
    """Build the (possibly chained, possibly keyed) digest function.

    Plain chain: digest-of-digest (``routers/mask.py:46-52``). Keyed chain:
    ``hmac.digest(key, b, alg)`` at every step (``routers/mask.py:67-73``).
    """
    for alg in algorithms:
        if alg not in _HASHLIB:
            raise ValueError(f"unimplemented hash algorithm `{alg}`")
    algs = list(algorithms)
    if key is None:
        if len(algs) == 1:
            h = _HASHLIB[algs[0]]

            def _hash_one(b: bytes) -> bytes:
                return h(b).digest()

            return _hash_one

        def _hash(b: bytes) -> bytes:
            for alg in algs:
                b = _HASHLIB[alg](b).digest()
            return b

        return _hash

    key_b = key.encode()

    def _hash_hmac(b: bytes) -> bytes:
        for alg in algs:
            b = hmac_mod.digest(key_b, b, _HASHLIB[alg])
        return b

    return _hash_hmac


def indices_for_value(
    value: str,
    hash_fn: Callable[[bytes], bytes],
    strategy: str,
    hash_values: int,
    nbits: int,
) -> np.ndarray:
    """Folded bit indices the hashed ``value`` sets in an ``nbits`` filter.

    Exact int-mixing contract of ``routers/mask.py:139-161``:

    - double:   h1 = i0^i1, h2 = i2^i3;  idx_i = h1 + i*h2                (i=1..k)
    - triple:   h1 = i0, h2 = i1, h3 = i2^i3; idx_i = h1 + i*h2 + h3*i*(i-1)//2
    - enhanced: h1 = i0^i1, h2 = i2^i3;  idx_i = h1 + i*h2 + (i^3 - i)//6
    - random:   seed = i0^i1^i2^i3; idx_i = Random(seed).randrange(nbits)

    plus the reference's negative-flip index fold (``bits.py:20-37``).
    """
    digest = hash_fn(value.encode())
    i0, i1, i2, i3 = destructure_digest(digest)
    k = hash_values
    i = np.arange(1, k + 1, dtype=np.int64)

    if strategy == "double_hash":
        raw = (i0 ^ i1) + i * (i2 ^ i3)
    elif strategy == "triple_hash":
        raw = i0 + i * i1 + (i2 ^ i3) * (i * (i - 1)) // 2
    elif strategy == "enhanced_double_hash":
        raw = (i0 ^ i1) + i * (i2 ^ i3) + (i**3 - i) // 6
    elif strategy == "random_hash":
        rng = Random(i0 ^ i1 ^ i2 ^ i3)
        # randrange yields non-negative < nbits, no fold needed, but fold is
        # harmless and keeps one code path
        raw = np.array([rng.randrange(nbits) for _ in range(k)], dtype=np.int64)
    else:
        raise ValueError(f"unimplemented hash strategy `{strategy}`")

    return fold_indices(raw, nbits)
