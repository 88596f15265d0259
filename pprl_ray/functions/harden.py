"""Hardeners: post-encoding bit-vector -> bit-vector transforms, replicating
``pprl_core/harden.py`` bit-for-bit but vectorised across whole batches.

Each hardener here operates on a 2-D unpacked 0/1 ``uint8`` matrix
``(rows, nbits)`` and returns a new matrix (possibly with a different bit
width). This exploits two reference properties:

- ``permute`` (``harden.py:88-108``) and ``randomized_response``
  (``harden.py:59-85``) re-seed their RNG *per filter* from a config seed, so
  the permutation / random draw sequence is identical for every row — it is
  precomputed once per (config, nbits) and applied to the whole batch with
  numpy fancy indexing.
- ``rule_90`` / ``balance`` / ``xor_fold`` are pure bit algebra.

``rehash`` (``harden.py:136-166``) is data-dependent (the window *content*
seeds the RNG) and runs per row, with a seed -> indices cache since window
values repeat heavily across rows.

The reference's biased Fisher-Yates (``rng.randrange(i)`` instead of ``i+1``,
``harden.py:102``) is replicated deliberately.
"""

from __future__ import annotations

import struct
from random import Random
from typing import Callable

import numpy as np

__all__ = [
    "balance",
    "xor_fold",
    "permute",
    "randomized_response",
    "rule_90",
    "rehash",
    "build_hardener_chain",
    "HARDENERS",
]

BatchHardener = Callable[[np.ndarray], np.ndarray]


def balance() -> BatchHardener:
    """Append a flipped copy: 2x length, exactly 50% bits set
    (``harden.py:21-35``)."""

    def _harden(bits: np.ndarray) -> np.ndarray:
        return np.concatenate([bits, 1 - bits], axis=1)

    return _harden


def xor_fold() -> BatchHardener:
    """Pad to even length with one zero bit, XOR the halves
    (``harden.py:38-56``)."""

    def _harden(bits: np.ndarray) -> np.ndarray:
        n = bits.shape[1]
        if n & 1:
            bits = np.concatenate([bits, np.zeros((bits.shape[0], 1), dtype=bits.dtype)], axis=1)
            n += 1
        m = n // 2
        return bits[:, :m] ^ bits[:, m:]

    return _harden


def _fisher_yates_perm(seed: int, n: int) -> np.ndarray:
    """Simulate the reference's (biased) Fisher-Yates on an index array:
    ``for i in n-1..1: j = Random(seed).randrange(i); swap`` — the resulting
    permutation is the same for every row of a given width."""
    rng = Random(seed)
    perm = list(range(n))
    for i in range(n - 1, 0, -1):
        j = rng.randrange(i)
        perm[i], perm[j] = perm[j], perm[i]
    return np.array(perm, dtype=np.int64)


def permute(seed: int) -> BatchHardener:
    cache: dict[int, np.ndarray] = {}

    def _harden(bits: np.ndarray) -> np.ndarray:
        n = bits.shape[1]
        perm = cache.get(n)
        if perm is None:
            perm = cache[n] = _fisher_yates_perm(seed, n)
        return bits[:, perm]

    return _harden


def randomized_response(seed: int, probability: float) -> BatchHardener:
    """Per bit i: draw d; if d > p keep, else set bit to (d < p/2)
    (``harden.py:59-85``). The draw sequence depends only on the seed, so the
    keep-mask and forced values are precomputed per width."""
    p_half = probability / 2
    cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _harden(bits: np.ndarray) -> np.ndarray:
        n = bits.shape[1]
        masks = cache.get(n)
        if masks is None:
            rng = Random(seed)
            d = np.array([rng.random() for _ in range(n)])
            masks = cache[n] = (d > probability, (d < p_half).astype(bits.dtype))
        keep, forced = masks
        return np.where(keep, bits, forced)

    return _harden


def rule_90() -> BatchHardener:
    """Each bit = XOR of circular left and right neighbours
    (``harden.py:111-129``; golden vectors ``10010 -> 01100``)."""

    def _harden(bits: np.ndarray) -> np.ndarray:
        return np.roll(bits, 1, axis=1) ^ np.roll(bits, -1, axis=1)

    return _harden


def rehash(window_size: int, window_step: int, k: int) -> BatchHardener:
    """Slide a window over the bits; each window's content (packed MSB-first,
    zero-padded to 4 bytes, read as ``<i``) seeds a ``Random`` that draws
    ``k`` indices to set (``harden.py:136-166``). Window range:
    ``range(0, nbits - window_size + 1, window_step)``."""
    seed_cache: dict[tuple[int, int], np.ndarray] = {}

    def _indices_for_seed(seed: int, nbits: int) -> np.ndarray:
        key = (seed, nbits)
        idx = seed_cache.get(key)
        if idx is None:
            rng = Random(seed)
            idx = seed_cache[key] = np.array(
                [rng.randrange(nbits) for _ in range(k)], dtype=np.int64
            )
        return idx

    def _harden(bits: np.ndarray) -> np.ndarray:
        rows, n = bits.shape
        out = bits.copy()
        starts = range(0, n - window_size + 1, window_step)
        for r in range(rows):
            row = bits[r]
            for i in starts:
                window_bytes = np.packbits(row[i : i + window_size], bitorder="big").tobytes()
                seed = struct.unpack_from("<i", window_bytes + b"\x00" * 4)[0]
                out[r, _indices_for_seed(seed, n)] = 1
        return out

    return _harden


HARDENERS = ("balance", "xor_fold", "permute", "randomized_response", "rule_90", "rehash")


def build_hardener_chain(configs: list[dict]) -> BatchHardener:
    """Resolve hardener config dicts (tagged by ``name``) into one fused
    batch function, applied in config order (``routers/mask.py:164-181``)."""
    chain: list[BatchHardener] = []
    for cfg in configs:
        name = cfg["name"]
        if name == "balance":
            chain.append(balance())
        elif name == "xor_fold":
            chain.append(xor_fold())
        elif name == "permute":
            chain.append(permute(cfg["seed"]))
        elif name == "randomized_response":
            chain.append(randomized_response(cfg["seed"], cfg["probability"]))
        elif name == "rule_90":
            chain.append(rule_90())
        elif name == "rehash":
            chain.append(rehash(cfg["window_size"], cfg["window_step"], cfg["samples"]))
        else:
            raise ValueError(f"unimplemented hardener `{name}`")

    def _fused(bits: np.ndarray) -> np.ndarray:
        for fn in chain:
            bits = fn(bits)
        return bits

    return _fused
