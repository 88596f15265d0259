"""Cuckoo filter: deletable approximate membership (Fan, Andersen,
Kaminsky & Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014).

Buckets of ``slots`` f-bit fingerprints; an item probes bucket
``i1 = h(x) % n`` and its partner ``i2 = i1 XOR (h(fp) % n)`` — the
partner is derivable from (bucket, fp) alone, which is what makes the
structure deletable AND mergeable: merging re-inserts the other filter's
stored (bucket, fp) entries without needing the original items.

Guarantees (tested):
- no false negatives, including after interleaved deletions (two items
  sharing (bucket-pair, fp) store two identical entries — deleting one
  leaves the other covered);
- false-positive rate <= 2*slots / 2^f  (~ 8/2^16 at the defaults);
- a bounded-kick overflow never drops an item — evictees land in an
  exact stash, so the no-false-negative contract survives pathological
  load factors (the stash is part of the serialized state);
- eviction choices come from a deterministic splitmix64 counter, so a
  fixed insert order gives a bit-identical filter.

Deletion is an ORDERED operation: partials built by independent workers
merge associatively (insert-only), and deletions apply to the merged
filter — the standard semantics for distributed deletable filters.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import hash_ints, splitmix64

__all__ = ["CuckooSketch"]


@register("cuckoo")
class CuckooSketch:
    def __init__(self, n_buckets: int = 1 << 14, slots: int = 4,
                 fp_bits: int = 16, seed: int = 0, max_kicks: int = 500):
        assert n_buckets >= 1 and (n_buckets & (n_buckets - 1)) == 0, \
            "n_buckets must be a power of two (XOR partner addressing)"
        assert 1 <= fp_bits <= 16
        self.n = int(n_buckets)
        self.slots = int(slots)
        self.fp_bits = int(fp_bits)
        self.seed = int(seed)
        self.max_kicks = int(max_kicks)
        self.table = np.zeros((self.n, self.slots), dtype=np.uint16)  # 0 = empty
        self.stash: list[tuple[int, int]] = []  # (bucket, fp) overflow, exact
        self.count = 0
        self._kick_ctr = 0

    # -- addressing -------------------------------------------------------

    def _fp(self, values: np.ndarray) -> np.ndarray:
        f = hash_ints(values, self.seed + 7) >> np.uint64(64 - self.fp_bits)
        return np.where(f == 0, 1, f).astype(np.uint16)  # fp 0 means empty

    def _i1(self, values: np.ndarray) -> np.ndarray:
        return (hash_ints(values, self.seed) % np.uint64(self.n)).astype(np.int64)

    def _partner(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        hf = splitmix64(fp.astype(np.uint64) + np.uint64(self.seed * 2 + 11))
        return (bucket.astype(np.uint64) ^ (hf % np.uint64(self.n))).astype(np.int64) % self.n

    # -- insert / delete / lookup ------------------------------------------

    def _insert_one(self, b: int, fp: int) -> None:
        for i in (b, int(self._partner(np.array([b]), np.array([fp], np.uint16))[0])):
            row = self.table[i]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = fp
                return
        cur_b, cur_fp = b, fp
        for _ in range(self.max_kicks):
            slot = int(splitmix64(np.array([self._kick_ctr], np.uint64))[0]
                       % np.uint64(self.slots))
            self._kick_ctr += 1
            cur_fp, self.table[cur_b, slot] = int(self.table[cur_b, slot]), cur_fp
            cur_b = int(self._partner(np.array([cur_b]),
                                      np.array([cur_fp], np.uint16))[0])
            row = self.table[cur_b]
            free = np.flatnonzero(row == 0)
            if len(free):
                row[free[0]] = cur_fp
                return
        self.stash.append((cur_b, cur_fp))  # exact overflow, never dropped

    def update(self, values: np.ndarray) -> None:
        values = np.unique(np.asarray(values))  # set semantics
        if len(values) == 0:
            return
        fps = self._fp(values)
        b1 = self._i1(values)
        self.count += len(values)
        for b, fp in zip(b1.tolist(), fps.tolist()):
            self._insert_one(int(b), int(fp))

    def delete(self, values: np.ndarray) -> int:
        """Remove ONE stored fingerprint per value (items must have been
        inserted — the cuckoo-filter deletion contract). Returns how many
        were found and removed."""
        values = np.unique(np.asarray(values))
        if len(values) == 0:
            return 0
        fps = self._fp(values)
        b1 = self._i1(values)
        b2 = self._partner(b1, fps)
        removed = 0
        for b_a, b_b, fp in zip(b1.tolist(), b2.tolist(), fps.tolist()):
            done = False
            for i in (int(b_a), int(b_b)):
                hit = np.flatnonzero(self.table[i] == fp)
                if len(hit):
                    self.table[i, hit[0]] = 0
                    done = True
                    break
            if not done:
                try:
                    self.stash.remove((int(b_a), int(fp)))
                    done = True
                except ValueError:
                    pass
            if done:
                removed += 1
                self.count -= 1
        return removed

    def contains(self, values: np.ndarray) -> np.ndarray:
        values = np.asarray(values)
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fp(values)
        b1 = self._i1(values)
        b2 = self._partner(b1, fps)
        hit = ((self.table[b1] == fps[:, None]).any(axis=1)
               | (self.table[b2] == fps[:, None]).any(axis=1))
        if self.stash:
            st = set(self.stash)
            miss = np.flatnonzero(~hit)
            for j in miss:
                if (int(b1[j]), int(fps[j])) in st or (int(b2[j]), int(fps[j])) in st:
                    hit[j] = True
        return hit

    # -- merge / readout ----------------------------------------------------

    def merge(self, other: "CuckooSketch") -> "CuckooSketch":
        assert (self.n, self.slots, self.fp_bits, self.seed) == \
               (other.n, other.slots, other.fp_bits, other.seed)
        occ = np.nonzero(other.table)
        for b, s in zip(occ[0].tolist(), occ[1].tolist()):
            self._insert_one(int(b), int(other.table[b, s]))
        for b, fp in other.stash:
            self._insert_one(int(b), int(fp))
        self.count += other.count
        return self

    def load_factor(self) -> float:
        return float((self.table != 0).sum() + len(self.stash)) / (self.n * self.slots)

    def fpr_bound(self) -> float:
        return 2.0 * self.slots / float(1 << self.fp_bits)

    # -- serialisation ------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = struct.pack("<iiiiqqi", self.n, self.slots, self.fp_bits,
                           self.seed, self.count, self._kick_ctr, len(self.stash))
        stash = b"".join(struct.pack("<iH", b, fp) for b, fp in self.stash)
        return head + stash + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooSketch":
        n, slots, fp_bits, seed, count, kick, n_stash = struct.unpack_from("<iiiiqqi", data)
        sk = cls(n, slots, fp_bits, seed)
        sk.count, sk._kick_ctr = count, kick
        off = struct.calcsize("<iiiiqqi")
        for _ in range(n_stash):
            b, fp = struct.unpack_from("<iH", data, off)
            sk.stash.append((b, fp))
            off += struct.calcsize("<iH")
        sk.table = (np.frombuffer(data, dtype=np.uint16, offset=off,
                                  count=n * slots).reshape(n, slots).copy())
        return sk
