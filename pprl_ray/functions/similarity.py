"""Bit-vector similarity measures (``pprl_core/similarity.py``), scalar and
vectorised.

The vectorised forms operate on packed uint8 matrices (rows x nbytes) and use
a 256-entry popcount LUT — one ``bitwise_and`` + table lookup per candidate
block instead of per-pair Python, which is what makes the crosswise
(block-nested-loop) matcher feasible at scale.
"""

from __future__ import annotations

import numpy as np

from .bitvec import _POPCOUNT_LUT, BitVec

__all__ = [
    "dice",
    "cosine",
    "jaccard",
    "popcounts",
    "crosswise_similarity",
    "pairwise_similarity",
    "SIMILARITY_MEASURES",
]

SIMILARITY_MEASURES = ("dice", "cosine", "jaccard")


def _counts(a: BitVec, b: BitVec) -> tuple[int, int, int]:
    n1 = a.count()
    n2 = b.count()
    n12 = int(_POPCOUNT_LUT[a.buf & b.buf].sum())
    return n1, n2, n12


def dice(a: BitVec, b: BitVec) -> float:
    """``2*|a&b| / (|a|+|b|)`` (``similarity.py:35-48``)."""
    n1, n2, n12 = _counts(a, b)
    return 2 * n12 / (n1 + n2)


def cosine(a: BitVec, b: BitVec) -> float:
    """``|a&b| / sqrt(|a|*|b|)`` (``similarity.py:51-64``)."""
    import math

    n1, n2, n12 = _counts(a, b)
    return n12 / math.sqrt(n1 * n2)


def jaccard(a: BitVec, b: BitVec) -> float:
    """``|a&b| / (|a|+|b|-|a&b|)`` (``similarity.py:67-80``)."""
    n1, n2, n12 = _counts(a, b)
    return n12 / (n1 + n2 - n12)


def popcounts(mat: np.ndarray) -> np.ndarray:
    """Row popcounts of a packed (rows, nbytes) uint8 matrix."""
    return _POPCOUNT_LUT[mat].sum(axis=1).astype(np.int64)


def _sim_from_counts(n1: np.ndarray, n2: np.ndarray, n12: np.ndarray, measure: str) -> np.ndarray:
    n1 = n1.astype(np.float64)
    n2 = n2.astype(np.float64)
    n12 = n12.astype(np.float64)
    if measure == "dice":
        return 2 * n12 / (n1 + n2)
    if measure == "cosine":
        return n12 / np.sqrt(n1 * n2)
    if measure == "jaccard":
        return n12 / (n1 + n2 - n12)
    raise ValueError(f"unimplemented similarity measure `{measure}`")


def crosswise_similarity(
    domain: np.ndarray, rng: np.ndarray, measure: str = "dice"
) -> np.ndarray:
    """Full (len(domain), len(rng)) similarity matrix for two packed uint8
    matrices — the vectorised core of the reference's crosswise θ-join
    (``routers/match.py:54-67``)."""
    pd_ = popcounts(domain)
    pr = popcounts(rng)
    inter = np.zeros((domain.shape[0], rng.shape[0]), dtype=np.int64)
    # AND-expand one domain row block at a time to bound memory
    for i in range(domain.shape[0]):
        inter[i] = _POPCOUNT_LUT[domain[i][None, :] & rng].sum(axis=1)
    return _sim_from_counts(pd_[:, None], pr[None, :], inter, measure)


def pairwise_similarity(a: np.ndarray, b: np.ndarray, measure: str = "dice") -> np.ndarray:
    """Row-aligned similarity of two equal-shape packed matrices
    (``routers/match.py:68-87``)."""
    if a.shape[0] != b.shape[0]:
        raise ValueError(
            f"length of domain and range lists do not match: domain has length of "
            f"{a.shape[0]}, range has length of {b.shape[0]}"
        )
    inter = _POPCOUNT_LUT[a & b].sum(axis=1).astype(np.int64)
    return _sim_from_counts(popcounts(a), popcounts(b), inter, measure)
