"""MinHash and SimHash signatures for near-duplicate detection.

- ``MinHashSketch``: Broder, "On the resemblance and containment of
  documents" (SEQUENCES 1997). k independent hash minima over a shingle set;
  E[matching fraction of two signatures] = Jaccard similarity. Mergeable by
  element-wise min (exactly order-invariant). ``signatures_for`` computes a
  (rows, k) matrix for a batch in one vectorised pass.
- LSH banding (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch.3):
  split the k-row signature into b bands of r rows; docs sharing any band
  hash become candidates. P(candidate) = 1 - (1 - s^r)^b.
- ``simhash64``: Charikar, "Similarity estimation techniques from rounding
  algorithms" (STOC 2002): 64-bit fingerprints whose Hamming distance tracks
  cosine similarity of the token-frequency vectors.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints, splitmix64

__all__ = ["MinHashSketch", "WeightedMinHashSketch", "SrpCosineSketch",
           "minhash_signatures", "band_keys", "simhash64", "hamming64"]


def _seeds(k: int, seed: int) -> np.ndarray:
    return splitmix64(np.arange(seed, seed + k, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15 | 1))


def minhash_signatures(token_lists: list[np.ndarray], k: int = 128, seed: int = 0) -> np.ndarray:
    """(rows, k) uint64 MinHash signature matrix for a batch of token-id
    arrays. Each row's tokens are hashed once, then the k permutations are
    simulated with per-permutation XOR seeds (one vector op per row)."""
    seeds = _seeds(k, seed)
    out = np.full((len(token_lists), k), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        if len(toks) == 0:
            continue
        h = hash_ints(np.asarray(toks))  # (n,)
        with np.errstate(over="ignore"):
            m = splitmix64(h[:, None] ^ seeds[None, :])  # (n, k)
        out[i] = m.min(axis=0)
    return out


def band_keys(signatures: np.ndarray, bands: int) -> np.ndarray:
    """(rows, bands) uint64 band-bucket keys: hash of each band's rows."""
    rows, k = signatures.shape
    assert k % bands == 0
    r = k // bands
    view = signatures.reshape(rows, bands, r)
    with np.errstate(over="ignore"):
        acc = np.zeros((rows, bands), dtype=np.uint64)
        for j in range(r):
            acc = splitmix64(acc ^ view[:, :, j])
    return acc


@register("minhash")
class MinHashSketch:
    """Corpus/set-level MinHash (mergeable by element-wise min); estimates
    Jaccard similarity between two accumulated sets."""

    def __init__(self, k: int = 128, seed: int = 0):
        self.k = int(k)
        self.seed = int(seed)
        self.mins = np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        h = hash_ints(np.asarray(values))
        with np.errstate(over="ignore"):
            m = splitmix64(h[:, None] ^ _seeds(self.k, self.seed)[None, :])
        np.minimum(self.mins, m.min(axis=0), out=self.mins)

    def merge(self, other: "MinHashSketch") -> "MinHashSketch":
        assert (self.k, self.seed) == (other.k, other.seed)
        np.minimum(self.mins, other.mins, out=self.mins)
        return self

    def jaccard(self, other: "MinHashSketch") -> float:
        return float((self.mins == other.mins).mean())

    def bbit_jaccard(self, other: "MinHashSketch", b: int = 8) -> float:
        """b-bit MinHash Jaccard (Li & Koenig, WWW 2010): keep only the
        lowest b bits of each minimum — a 64/b-fold signature compression —
        and correct the 2^-b accidental-collision floor:
        J ≈ (eq_frac - 2^-b) / (1 - 2^-b). Computed as an exact integer
        ratio (eq*2^b - k) / (k*(2^b - 1)) so the float estimate is
        bit-reproducible and SQL-replicable. Storage-accuracy trade:
        var grows by ~1/(1-2^-b) while signatures shrink 64/b-fold."""
        assert (self.k, self.seed) == (other.k, other.seed)
        mask = np.uint64((1 << b) - 1)
        eq = int(((self.mins & mask) == (other.mins & mask)).sum())
        return float(eq * (1 << b) - self.k) / float(self.k * ((1 << b) - 1))

    def to_bytes(self) -> bytes:
        return struct.pack("<qq", self.k, self.seed) + self.mins.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "MinHashSketch":
        k, seed = struct.unpack_from("<qq", data)
        sk = cls(k, seed)
        sk.mins = np.frombuffer(data, dtype=np.uint64, count=k, offset=16).copy()
        return sk


@register("weighted_minhash")
class WeightedMinHashSketch:
    """Weighted MinHash over integer-weighted items via slot expansion
    (the classic reduction: an item with weight ``w`` becomes ``w``
    occurrence slots ``(item, 1..w)`` and plain MinHash runs over the slot
    set — Broder 1997 applied to multisets; see also Haveliwala et al.,
    "Scalable techniques for clustering the web", WebDB 2000).
    ``jaccard`` then estimates the WEIGHTED Jaccard similarity
    ``sum_t min(a_t, b_t) / sum_t max(a_t, b_t)``: shared slots are exactly
    the ``min`` counts, the slot union is the ``max`` counts, and a
    permutation's two minima agree iff the winning slot is shared.

    Every op is 64-bit integer (splitmix64 chains), so signatures are
    bit-reproducible and SQL-replicable. Cost is O(total weight) per
    update — right for count-like weights (token frequencies, click
    counts), not for huge weights; rescale those first.

    MERGE CONTRACT: element-wise min assumes each item's FINAL weight is
    presented once (aggregate counts per item first, e.g. a groupby, then
    sketch the count table — partials over value-partitioned rows are
    fine). Presenting partial weights w1, w2 of the same item to two
    partials merges to slot coverage max(w1, w2), not w1 + w2."""

    def __init__(self, k: int = 32, seed: int = 0):
        self.k = int(k)
        self.seed = int(seed)
        self.mins = np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)

    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values)
        if len(values) == 0:
            return
        w = (np.ones(len(values), dtype=np.int64) if weights is None
             else np.asarray(weights).astype(np.int64))
        if (w <= 0).any():
            raise ValueError("weights must be positive integers")
        # occurrence slots: item v with weight w -> (v, 1), ..., (v, w)
        rep = np.repeat(values.astype(np.uint64), w)
        total = int(w.sum())
        ends = np.cumsum(w)
        occ = (np.arange(1, total + 1, dtype=np.uint64)
               - np.repeat((ends - w).astype(np.uint64), w))
        with np.errstate(over="ignore"):
            slots = splitmix64(splitmix64(rep) ^ occ)
            # per-permutation minima; chunk the k loop, not the slots
            for j, s in enumerate(_seeds(self.k, self.seed)):
                m = splitmix64(slots ^ s).min()
                if m < self.mins[j]:
                    self.mins[j] = m

    def merge(self, other: "WeightedMinHashSketch") -> "WeightedMinHashSketch":
        assert (self.k, self.seed) == (other.k, other.seed)
        np.minimum(self.mins, other.mins, out=self.mins)
        return self

    def jaccard(self, other: "WeightedMinHashSketch") -> float:
        """Estimate of sum(min)/sum(max) over the two weight vectors:
        exact integer ratio eq/k, bit-reproducible."""
        assert (self.k, self.seed) == (other.k, other.seed)
        return float((self.mins == other.mins).sum()) / float(self.k)

    def to_bytes(self) -> bytes:
        return struct.pack("<qq", self.k, self.seed) + self.mins.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "WeightedMinHashSketch":
        k, seed = struct.unpack_from("<qq", data)
        sk = cls(k, seed)
        sk.mins = np.frombuffer(data, dtype=np.uint64, count=k, offset=16).copy()
        return sk


@register("srp_cosine")
class SrpCosineSketch:
    """Group-level signed-random-projection (SimHash) cosine sketch
    (Charikar, STOC 2002) over weighted items — the mergeable-UDAF analog
    of the per-doc :func:`simhash64` fingerprints. State is ``bits``
    signed int64 accumulators ``acc_j = sum_t w_t * s_j(t)`` where
    ``s_j(t) = ±1`` is bit ``j`` of a splitmix64 chain of the item hash.

    Merge is accumulator ADDITION, so duplicate items across partials sum
    exactly — no pre-aggregation contract (contrast
    :class:`WeightedMinHashSketch`): update straight from raw rows with
    weight 1 per occurrence and the sketch accumulates counts itself.
    ``sign(acc)`` is the group's simhash; between two groups the
    matching-bit fraction ``f`` estimates ``1 - theta/pi`` where theta is
    the angle between the groups' weight vectors, so ``cos(pi*(1-f))``
    estimates their cosine similarity. All state and the match fraction
    are exact integers/rationals (SQL-replicable); only :meth:`cosine`
    applies a float transcendental."""

    def __init__(self, bits: int = 64, seed: int = 0):
        if bits % 64 != 0:
            raise ValueError("bits must be a multiple of 64")
        self.bits = int(bits)
        self.seed = int(seed)
        self.acc = np.zeros(self.bits, dtype=np.int64)

    def update(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values)
        if len(values) == 0:
            return
        w = (np.ones(len(values), dtype=np.int64) if weights is None
             else np.asarray(weights).astype(np.int64))
        shifts = np.arange(64, dtype=np.uint64)
        with np.errstate(over="ignore"):
            base = splitmix64(values.astype(np.uint64))
            for wi, s in enumerate(_seeds(self.bits // 64, self.seed)):
                h = splitmix64(base ^ s)
                signs = (((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                         * 2 - 1)
                self.acc[wi * 64:(wi + 1) * 64] += (signs * w[:, None]).sum(axis=0)

    def merge(self, other: "SrpCosineSketch") -> "SrpCosineSketch":
        assert (self.bits, self.seed) == (other.bits, other.seed)
        self.acc += other.acc
        return self

    def signature(self) -> np.ndarray:
        """Sign bits (acc > 0, zero ties -> 0) as a 0/1 int8 vector."""
        return (self.acc > 0).astype(np.int8)

    def match_frac(self, other: "SrpCosineSketch") -> float:
        """Matching-sign fraction: exact rational eq/bits, estimates
        1 - theta/pi."""
        assert (self.bits, self.seed) == (other.bits, other.seed)
        eq = int((self.signature() == other.signature()).sum())
        return float(eq) / float(self.bits)

    def cosine(self, other: "SrpCosineSketch") -> float:
        """Cosine-similarity estimate cos(pi * (1 - match_frac))."""
        import math

        return math.cos(math.pi * (1.0 - self.match_frac(other)))

    def to_bytes(self) -> bytes:
        return struct.pack("<qq", self.bits, self.seed) + self.acc.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "SrpCosineSketch":
        bits, seed = struct.unpack_from("<qq", data)
        sk = cls(bits, seed)
        sk.acc = np.frombuffer(data, dtype=np.int64, count=bits, offset=16).copy()
        return sk


def simhash64(token_lists: list[np.ndarray], seed: int = 0) -> np.ndarray:
    """64-bit SimHash fingerprints for a batch of token-id arrays."""
    out = np.empty(len(token_lists), dtype=np.uint64)
    bit_cols = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        if len(toks) == 0:
            out[i] = 0
            continue
        h = hash_ints(np.asarray(toks), seed)
        # (n, 64) sign contributions: +1 where bit set, -1 otherwise
        bits = ((h[:, None] & bit_cols[None, :]) != 0).astype(np.int32)
        score = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(((score > 0).astype(np.uint64) * bit_cols).sum(dtype=np.uint64))
    return out


_POPCOUNT_LUT16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays."""
    x = a ^ b
    d = np.zeros(x.shape, dtype=np.int64)
    for shift in (0, 16, 32, 48):
        d += _POPCOUNT_LUT16[((x >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)]
    return d
