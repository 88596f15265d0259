"""REQ sketch — Relative-Error Quantiles (Cormode, Karnin, Liberty,
Thaler, Veselý, "Relative Error Streaming Quantiles", PODS 2021),
HRA (high-rank-accuracy) orientation: rank-error GROWS toward the low
ranks and stays multiplicatively small at the top — the right shape for
tail questions ("what is the p99.9 of n_tok") where KLL's uniform
additive εn error is uninformative. Implemented from the paper's
relative-compactor design (the schedule popularized by the Apache
DataSketches REQ documentation of the same paper); no code reused.

Structure: a ladder of RELATIVE compactors. Each holds ``2·m·k`` items
(m sections of size k, m doubling / k halving as compactions accumulate,
so capacity stays put while granularity refines). A compaction sorts the
buffer, PROTECTS the top half plus the leading sections (HRA), and
promotes alternating items from only the lowest ``z`` sections, where
``z-1`` is the number of trailing ones of the compaction counter — so
low sections compact geometrically more often than high ones, which is
exactly where the relative-error guarantee comes from (paper §4). The
compaction coin is a seeded splitmix64 counter and alternates
deterministically on odd states (the variance-halving trick), so
single-topology runs are bit-reproducible, like the KLL here.

Guarantees: while no compaction has happened the sketch is EXACT (the
driver-oracle regime). After compactions, the paper gives
``|r̂(x) − r(x)| ≤ ε·(n − r(x))`` for HRA with
``ε = O(√log(εn)/k)``; the property tests gate an empirical
relative-error envelope at the accurate (high-rank) end plus the
degradation ordering (top ranks strictly more accurate than mid ranks).
Merges concatenate per-level buffers, OR the compaction counters and
re-compact — the published mergeability argument; merged error adds in
the paper's bound and the tests assert the envelope across merge orders.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import register
from .hashing import splitmix64

__all__ = ["REQSketch"]

_MIN_SEC = 4
_INIT_SECTIONS = 3


def _trailing_ones(x: int) -> int:
    n = 0
    while x & 1:
        n += 1
        x >>= 1
    return n


class _RelCompactor:
    __slots__ = ("buf", "sec_size", "num_secs", "state", "coin")

    def __init__(self, sec_size: int):
        self.buf: list[float] = []
        self.sec_size = sec_size
        self.num_secs = _INIT_SECTIONS
        self.state = 0
        self.coin = 0

    def capacity(self) -> int:
        return 2 * self.num_secs * self.sec_size


@register("req")
class REQSketch:
    def __init__(self, k: int = 32, seed: int = 0):
        assert k >= _MIN_SEC and k % 2 == 0
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[_RelCompactor] = [_RelCompactor(self.k)]
        self.n = 0
        self._coin_ctr = np.uint64(seed)

    # -- building -----------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return
        self.n += len(values)
        self.levels[0].buf.extend(values.tolist())
        self._compress()

    def _flip(self) -> int:
        self._coin_ctr += np.uint64(1)
        return int(
            splitmix64(np.array([self._coin_ctr], np.uint64))[0] & np.uint64(1)
        )

    def _compress(self) -> None:
        changed = True
        while changed:
            changed = False
            for lvl in range(len(self.levels)):
                c = self.levels[lvl]
                if len(c.buf) >= c.capacity():
                    self._compact(lvl)
                    changed = True
                    break

    def _compact(self, lvl: int) -> None:
        c = self.levels[lvl]
        if lvl + 1 >= len(self.levels):
            self.levels.append(_RelCompactor(self.k))
        c.buf.sort()
        z = min(_trailing_ones(c.state) + 1, c.num_secs)
        # HRA: protect the top half plus the (num_secs - z) highest
        # sections of the bottom half; compact only the lowest z sections
        non_compact = c.capacity() // 2 + (c.num_secs - z) * c.sec_size
        hi = len(c.buf) - non_compact
        if hi <= 0:
            c.state += 1
            self._ensure_sections(c)
            return
        if hi % 2:  # even promotion count; shrinking protects one more
            hi -= 1
        if hi <= 0:
            c.state += 1
            self._ensure_sections(c)
            return
        if c.state & 1:  # deterministic alternation on odd states
            c.coin ^= 1
        else:
            c.coin = self._flip()
        self.levels[lvl + 1].buf.extend(c.buf[c.coin:hi:2])
        del c.buf[:hi]
        c.state += 1
        self._ensure_sections(c)

    @staticmethod
    def _ensure_sections(c: _RelCompactor) -> None:
        while (
            c.state >= (1 << (c.num_secs - 1)) and c.sec_size > _MIN_SEC
        ):
            c.sec_size //= 2
            c.num_secs *= 2

    # -- UDAF contract ------------------------------------------------------

    def merge(self, other: "REQSketch") -> "REQSketch":
        assert self.k == other.k
        while len(self.levels) < len(other.levels):
            self.levels.append(_RelCompactor(self.k))
        for lvl, oc in enumerate(other.levels):
            c = self.levels[lvl]
            c.buf.extend(oc.buf)
            c.state |= oc.state  # the published counter-OR merge rule
            c.sec_size = min(c.sec_size, oc.sec_size)
            c.num_secs = max(c.num_secs, oc.num_secs)
            self._ensure_sections(c)
        self.n += other.n
        self._compress()
        return self

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<qqqqQ", self.k, self.seed, self.n, len(self.levels),
            int(self._coin_ctr),
        )
        parts = [head]
        for c in self.levels:
            arr = np.array(sorted(c.buf), np.float64)
            parts.append(
                struct.pack("<qqqqq", c.sec_size, c.num_secs, c.state,
                            c.coin, len(arr))
            )
            parts.append(arr.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "REQSketch":
        k, seed, n, n_levels, ctr = struct.unpack_from("<qqqqQ", data)
        sk = cls(k, seed)
        sk.n = n
        sk._coin_ctr = np.uint64(ctr)
        sk.levels = []
        off = 40
        for _ in range(n_levels):
            ss, ns, st, coin, ln = struct.unpack_from("<qqqqq", data, off)
            off += 40
            c = _RelCompactor(ss)
            c.num_secs, c.state, c.coin = ns, st, coin
            c.buf = list(np.frombuffer(data, np.float64, ln, off))
            off += 8 * ln
            sk.levels.append(c)
        return sk

    # -- readouts -----------------------------------------------------------

    def is_exact(self) -> bool:
        return len(self.levels) == 1 and self.levels[0].state == 0

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for lvl, c in enumerate(self.levels):
            if c.buf:
                vals.append(np.array(c.buf, np.float64))
                weights.append(np.full(len(c.buf), 1 << lvl, np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, x: float) -> float:
        """Estimated NORMALIZED rank of x (fraction of items <= x)."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        return float(w[v <= x].sum() / w.sum())

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        j = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(j, len(v) - 1)])
