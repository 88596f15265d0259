"""DDSketch (Masson, Rim & Lee, VLDB 2019): quantile sketch with a
RELATIVE-error guarantee — the returned quantile estimate is within
``alpha = (gamma-1)/(gamma+1)`` of the true quantile VALUE, regardless of
the value distribution. Complements KLL/t-digest (``quantiles.py``),
whose guarantees are on RANK error: DDSketch's error scales with the
answer itself, so a p99.9 of a heavy-tailed latency/length column is as
accurate (relatively) as the median.

State is a histogram of log-spaced buckets: positive value ``x`` lands in
bucket ``i = min{ i : gamma^i >= x }`` (= ``ceil(log_gamma x)``), each
bucket's representative value is ``2*gamma^i/(gamma+1)`` (the midpoint of
``(gamma^(i-1), gamma^i]`` in relative terms). Merge = per-bucket counter
ADD — exactly associative, commutative, and order/partitioning-invariant
(the UDAF contract), unlike t-digest whose merge is only invariant within
its rank bound.

Exact rational mapping. ``gamma`` here is the RATIONAL 5/4 (``alpha`` =
1/9 ≈ 11.1% relative error) by default, and the bucket index of an
integer ``x`` is decided by the EXACT integer comparison
``5^i >= x * 4^i`` (Python bigints; a vectorised float ``ceil(ln x /
ln gamma)`` guess is corrected against the exact predicate on the unique
values). This makes every bucket boundary libm-independent and lets a SQL
oracle reproduce the whole sketch — bucket histogram, rank walk and
float readout — bit-for-bit: DuckDB builds the same powers with a
recursive HUGEINT CTE (exact up to ``i = 54``, i.e. ``x <= 5^54/4^54 ≈
1.7e5``; larger values fall back to the float mapping in both places).
Bucket readout value ``(8/9) * (5^i/4^i)`` is computed as
``float(5**i) / float(4**i) * (8/9)`` — two correctly-rounded int->double
conversions and IEEE ops, bit-identical to the CTE's
``CAST(p5 AS DOUBLE)/CAST(p4 AS DOUBLE) * (8.0/9.0)``.

Bounded memory: above ``max_bins`` live buckets the LOWEST buckets
collapse into the smallest kept one (the paper's eviction policy —
guarantees survive for all quantiles above the collapsed mass). With the
default 2048 bins the collapse never triggers below ``x ≈ 5^2048/4^2048``
— effectively never for integer columns — so the merge stays exactly
invariant; collapse semantics are still implemented and tested.

No counterpart in the reference (pprl has no quantile machinery);
extends the sketch registry pattern of ``sketches/base.py``.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register

__all__ = ["DDSketch", "exact_log_buckets"]

_LOG_GAMMA = float(np.log(1.25))
# 5^i / 4^i stays exactly comparable in HUGEINT (and the SQL oracle's
# recursive CTE) through i = 54; values above gamma^54 use the float path.
_EXACT_MAX_I = 54


def exact_log_buckets(values: np.ndarray, gamma_num: int = 5, gamma_den: int = 4) -> np.ndarray:
    """Bucket index ``min{ i>=0 : (num/den)^i >= x }`` for positive ints,
    decided exactly (float guess + bigint correction on unique values)."""
    v = np.asarray(values)
    if v.dtype.kind == "f":
        raise TypeError("DDSketch exact mapping is over positive integer values")
    v = v.astype(np.int64, copy=False)
    if len(v) and int(v.min()) <= 0:
        raise ValueError("DDSketch accepts positive values only (zero/negative unsupported)")
    uniq, inv = np.unique(v, return_inverse=True)
    lg = np.log(float(gamma_num) / float(gamma_den))
    guess = np.ceil(np.log(uniq.astype(np.float64)) / lg).astype(np.int64)
    np.maximum(guess, 0, out=guess)
    for k in range(len(uniq)):
        x = int(uniq[k])
        i = int(guess[k])
        if i <= _EXACT_MAX_I:
            while gamma_num**i < x * gamma_den**i:
                i += 1
            while i > 0 and gamma_num ** (i - 1) >= x * gamma_den ** (i - 1):
                i -= 1
            guess[k] = i
    return guess[inv]


@register("ddsketch")
class DDSketch:
    def __init__(self, max_bins: int = 2048):
        self.max_bins = int(max_bins)
        self.counts: dict[int, int] = {}
        self.n = 0

    # -- update / merge ------------------------------------------------------

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(values) == 0:
            return
        buckets = exact_log_buckets(values)
        if counts is None:
            counts = np.ones(len(values), dtype=np.int64)
        ub, inv = np.unique(buckets, return_inverse=True)
        sums = np.zeros(len(ub), dtype=np.int64)
        np.add.at(sums, inv, np.asarray(counts, dtype=np.int64))
        for b, c in zip(ub.tolist(), sums.tolist()):
            self.counts[b] = self.counts.get(b, 0) + c
        self.n += int(sums.sum())
        self._maybe_collapse()

    def merge(self, other: "DDSketch") -> "DDSketch":
        for b, c in other.counts.items():
            self.counts[b] = self.counts.get(b, 0) + c
        self.n += other.n
        self._maybe_collapse()
        return self

    def _maybe_collapse(self) -> None:
        """Paper's bounded-memory policy: collapse the LOWEST buckets into
        the smallest surviving one. Never triggers for integer inputs under
        the default ``max_bins`` (see module docstring)."""
        while len(self.counts) > self.max_bins:
            lo = sorted(self.counts)[:2]
            self.counts[lo[1]] += self.counts.pop(lo[0])

    # -- readout ---------------------------------------------------------------

    @staticmethod
    def bucket_value(i: int) -> float:
        """Representative value 2*gamma^i/(gamma+1) = (8/9)*(5/4)^i,
        computed with exact-int->double conversions (bit-stable, matches
        the SQL oracle's HUGEINT casts)."""
        if i <= _EXACT_MAX_I:
            return (float(5**i) / float(4**i)) * (8.0 / 9.0)
        return float(1.25**i) * (8.0 / 9.0)

    def quantile_rank(self, rank: int) -> float:
        """Value estimate at 1-indexed ``rank`` in sorted order: walk the
        bucket histogram ascending until the cumulative count reaches it."""
        if not 1 <= rank <= self.n:
            raise ValueError(f"rank {rank} outside [1, {self.n}]")
        cum = 0
        for b in sorted(self.counts):
            cum += self.counts[b]
            if cum >= rank:
                return self.bucket_value(b)
        raise AssertionError("unreachable: counts sum to n")

    def quantile_rational(self, num: int, den: int) -> float:
        """Quantile ``q = num/den`` via the EXACT integer rank rule
        ``r = (n-1)*num // den + 1`` — no float multiply, so the rank (and
        hence the estimate) is reproducible in integer SQL."""
        return self.quantile_rank((self.n - 1) * num // den + 1)

    def quantile(self, q: float) -> float:
        """Float-q convenience API (paper's rank rule floor(q*(n-1))+1)."""
        if not 0.0 <= q <= 1.0:
            raise ValueError("q outside [0,1]")
        return self.quantile_rank(int(np.floor(q * (self.n - 1))) + 1)

    @staticmethod
    def alpha() -> float:
        """Guaranteed relative error bound (gamma-1)/(gamma+1) = 1/9."""
        return 1.0 / 9.0

    # -- serialization: sorted (bucket:int32, count:int64) pairs ---------------

    def to_bytes(self) -> bytes:
        items = sorted(self.counts.items())
        out = [struct.pack("<qiq", self.n, self.max_bins, len(items))]
        for b, c in items:
            out.append(struct.pack("<iq", b, c))
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketch":
        n, max_bins, k = struct.unpack_from("<qiq", data)
        sk = cls(max_bins)
        sk.n = n
        off = 20
        for _ in range(k):
            b, c = struct.unpack_from("<iq", data, off)
            sk.counts[b] = c
            off += 12
        return sk
