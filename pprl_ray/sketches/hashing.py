"""Vectorised 64-bit hashing for sketch updates.

``splitmix64`` (Steele, Lea & Flood, "Fast Splittable Pseudorandom Number
Generators", OOPSLA 2014) is a strong 64-bit finalizer/mixer that vectorises
to three multiplies + shifts in numpy — ideal for hashing int token-id
columns without per-row Python. String inputs are folded to 64-bit ints with
a vectorised FNV-1a over the raw bytes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["splitmix64", "hash_ints", "hash_strings"]

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Mix uint64 values; bijective, so distinct inputs stay distinct."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z ^= z >> np.uint64(30)
        z *= _M1
        z ^= z >> np.uint64(27)
        z *= _M2
        z ^= z >> np.uint64(31)
    return z


def hash_ints(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """64-bit hashes of an integer array (optionally seeded)."""
    v = values.astype(np.uint64, copy=False)
    if seed:
        with np.errstate(over="ignore"):
            v = v ^ splitmix64(np.uint64(seed) + np.zeros(1, dtype=np.uint64))[0]
    return splitmix64(v)


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Vectorised 64-bit hashes of a string column (polars' xxhash-based
    ``Series.hash``), splitmix64-finalised. Deterministic within a polars
    version — used for dedup/minhash shingles, not for any reference-
    conformance path (those use hashlib exactly)."""
    import polars as pl

    if not isinstance(values, pl.Series):
        values = pl.Series(values)
    return hash_ints(values.hash(seed=seed & 0xFFFFFFFFFFFFFFFF).to_numpy())
