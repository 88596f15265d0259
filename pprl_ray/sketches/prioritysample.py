"""Priority sampling: a mergeable weighted-sample sketch for subset-sum
estimation.

Duffield, Lund & Thorup, "Priority Sampling for Estimation of Arbitrary
Subset Sums" (JACM 54(6), 2007): each item i with weight w_i draws a uniform
u_i in (0, 1] and gets priority q_i = w_i / u_i; the sketch keeps the k
items of highest priority plus the (k+1)-st priority tau as a threshold.
For ANY subset S chosen after the fact, sum_{i in S, sampled} max(w_i, tau)
is an (essentially) unbiased estimator of sum_{i in S} w_i, with variance
at most W^2 / (k - 1) for the full-set sum. One global sample therefore
answers every per-source / per-bucket total-weight question at once — the
weighted counterpart of KMV's coordinated distinct sample
(:mod:`pprl_ray.sketches.kmv`).

Determinism / SQL conformance (this library's ESTIMATION-mode oracle
discipline): u_i is derived from the item key as
``h_i = max(splitmix64(key_i ^ mix(seed)), 1)`` so u_i = h_i / 2^64, and the
sample order is the exact integer total order

    (s_i, h_i, key_i)   with   s_i = h_i DIV w_i   (ascending)

— a floor-quantised proxy for u_i / w_i = 1 / q_i. Flooring loses at most
log2(w_i) low bits of tie resolution (ties then break on h, then key), so
the selection is statistically indistinguishable from exact priority order
while every comparison stays in uint64 — fully vectorised in numpy AND
replicable verbatim in DuckDB HUGEINT SQL (``__ray_entry__.oracle_sql()
['priority_subset_sum']`` recomputes the whole sketch, threshold and
estimate). The threshold is the exact rational

    tau = w_(k+1) * 2^64 / h_(k+1)

taken from the (k+1)-st item in that order, and estimates are emitted as
exact fixed-point integers: ``max(w_i, tau)`` contributes
``w_i * scale`` when ``w_i * h_(k+1) >= w_(k+1) * 2^64`` else
``(w_(k+1) << 64) * scale // h_(k+1)`` — no floats anywhere.

Merge = concatenate + dedupe by key + re-prune to the smallest k+1 items in
the total order; a total order makes the prune exactly associative,
commutative and idempotent (property-tested in tests/test_round4g.py).

State is O(k): keys, h, weights and an opaque per-item string payload (the
post-hoc subset attribute, e.g. ``source``).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints

__all__ = ["PrioritySampleSketch"]

_U64 = 1 << 64


@register("psample")
class PrioritySampleSketch:
    def __init__(self, k: int = 64, seed: int = 0):
        assert k >= 2
        self.k = int(k)
        self.seed = int(seed)
        self.keys = np.empty(0, dtype=np.uint64)
        self.h = np.empty(0, dtype=np.uint64)
        self.w = np.empty(0, dtype=np.int64)
        self.payloads = np.empty(0, dtype=object)

    # -- updates ------------------------------------------------------------

    def update(self, keys: np.ndarray, weights: np.ndarray, payloads=None) -> None:
        """Absorb items (key:int64/uint64, weight >= 1, optional payload).

        Keys must identify items uniquely (re-observing a key is idempotent);
        weights must be positive integers."""
        keys = np.asarray(keys).astype(np.uint64, copy=False)
        if len(keys) == 0:
            return
        w = np.asarray(weights).astype(np.int64, copy=False)
        if w.min() < 1:
            raise ValueError("priority sampling needs integer weights >= 1")
        h = np.maximum(hash_ints(keys, self.seed), np.uint64(1))
        if payloads is None:
            p = np.full(len(keys), "", dtype=object)
        else:
            p = np.asarray(payloads, dtype=object)
        self._absorb(keys, h, w, p)

    def _absorb(self, keys, h, w, p) -> None:
        keys = np.concatenate([self.keys, keys])
        h = np.concatenate([self.h, h])
        w = np.concatenate([self.w, w])
        p = np.concatenate([self.payloads, p]) if len(self.payloads) or len(p) else p
        # enforce the re-observation contract EXPLICITLY: a key re-seen
        # with a different weight would not sort adjacent below and would
        # silently double-count — detect and raise instead
        if len(keys) > 1:
            ks = np.argsort(keys, kind="stable")
            kk, ww = keys[ks], w[ks]
            dup = kk[1:] == kk[:-1]
            if dup.any() and (ww[1:][dup] != ww[:-1][dup]).any():
                raise ValueError(
                    "priority sample key re-observed with a different weight"
                )
        s = h // w.astype(np.uint64)
        order = np.lexsort((keys, h, s))
        keys, h, w, p, s = keys[order], h[order], w[order], p[order], s[order]
        # dedupe re-observed keys (identical (s, h, key) triples sort adjacent
        # — guaranteed by the equal-weight check above)
        if len(keys) > 1:
            fresh = np.empty(len(keys), dtype=bool)
            fresh[0] = True
            np.not_equal(keys[1:], keys[:-1], out=fresh[1:])
            keys, h, w, p = keys[fresh], h[fresh], w[fresh], p[fresh]
        keep = min(len(keys), self.k + 1)
        self.keys, self.h, self.w, self.payloads = (
            keys[:keep], h[:keep], w[:keep], p[:keep],
        )

    def merge(self, other: "PrioritySampleSketch") -> "PrioritySampleSketch":
        assert (self.k, self.seed) == (other.k, other.seed)
        self._absorb(other.keys, other.h, other.w, other.payloads)
        return self

    # -- readouts -----------------------------------------------------------

    def threshold(self) -> tuple[int, int]:
        """tau as the exact rational (num, den); (0, 1) in exact mode
        (fewer than k+1 items seen -> every weight is exact)."""
        if len(self.keys) <= self.k:
            return 0, 1
        return int(self.w[self.k]) << 64, int(self.h[self.k])

    def sample(self):
        """(keys, weights, payloads) of the retained sample (top-k)."""
        n = min(len(self.keys), self.k)
        return self.keys[:n], self.w[:n], self.payloads[:n]

    def subset_sums(self, scale: int = 1_000_000) -> dict[str, tuple[int, int]]:
        """{payload: (n_sampled, estimate * scale)} with the estimate in
        exact fixed-point integer arithmetic (floor on the tau term only,
        mirrored bit-for-bit by the SQL oracle)."""
        num, den = self.threshold()
        _, w, p = self.sample()
        tau_scaled = (num * scale) // den if num else 0
        out: dict[str, tuple[int, int]] = {}
        for payload in np.unique(p.astype(str)) if len(p) else []:
            mask = p.astype(str) == payload
            wi = w[mask]
            hi_mask = wi.astype(object) * den >= num
            est = int(wi[hi_mask].sum()) * scale + int((~hi_mask).sum()) * tau_scaled
            out[str(payload)] = (int(mask.sum()), est)
        return out

    def estimate_total(self, scale: int = 1_000_000) -> int:
        """Fixed-point estimate of the TOTAL weight (the all-items subset)."""
        return sum(est for _, est in self.subset_sums(scale).values())

    def relative_error_bound(self) -> float:
        """Full-set standard error / W <= 1/sqrt(k-1) (DLT 2007, Thm 1)."""
        return 1.0 / np.sqrt(self.k - 1)

    # -- serialisation --------------------------------------------------------

    def to_bytes(self) -> bytes:
        # length-prefixed payloads: safe for ANY payload bytes (a NUL in a
        # payload under the old b"\x00"-join silently misaligned every
        # subsequent payload on round-trip)
        enc = [str(x).encode() for x in self.payloads]
        payload_blob = b"".join(struct.pack("<i", len(e)) + e for e in enc)
        head = struct.pack("<qqqq", self.k, self.seed, len(self.keys), len(payload_blob))
        return (head + self.keys.tobytes() + self.h.tobytes()
                + self.w.tobytes() + payload_blob)

    @classmethod
    def from_bytes(cls, data: bytes) -> "PrioritySampleSketch":
        k, seed, n, plen = struct.unpack_from("<qqqq", data, 0)
        sk = cls(k, seed)
        off = 32
        sk.keys = np.frombuffer(data, np.uint64, n, off).copy()
        off += 8 * n
        sk.h = np.frombuffer(data, np.uint64, n, off).copy()
        off += 8 * n
        sk.w = np.frombuffer(data, np.int64, n, off).copy()
        off += 8 * n
        payloads = []
        end = off + plen
        while off < end:
            (ln,) = struct.unpack_from("<i", data, off)
            off += 4
            payloads.append(data[off:off + ln].decode())
            off += ln
        sk.payloads = (np.array(payloads, dtype=object)
                       if n else np.empty(0, dtype=object))
        return sk
