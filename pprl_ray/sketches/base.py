"""Mergeable-sketch protocol.

Every sketch is a small mutable state object with:

- ``update(values)`` — absorb a numpy array of observations (vectorised);
- ``merge(other)`` — associative, commutative combine (the UDAF contract);
- ``to_bytes()`` / ``from_bytes()`` — compact serialisation for shuffle rows
  and per-partition checkpoints;
- an estimator (``estimate`` / ``query`` / ``quantile`` — sketch-specific).

Bloom (bytes-OR), HLL (register-max) and CMS (counter-add) merges are exactly
order-invariant; t-digest / KLL merges are order-invariant within their
published rank-error bounds (property-tested in ``tests/test_sketches.py``).

Registry: ``SKETCHES[name] -> class`` for config-driven pipelines, mirroring
the reference's registry-dict extension pattern
(``pprl_service/routers/mask.py:114-121``).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np

__all__ = ["Sketch", "SKETCHES", "register"]


@runtime_checkable
class Sketch(Protocol):
    def update(self, values: np.ndarray) -> None: ...

    def merge(self, other: "Sketch") -> "Sketch": ...

    def to_bytes(self) -> bytes: ...

    @classmethod
    def from_bytes(cls, data: bytes) -> "Sketch": ...


SKETCHES: dict[str, type] = {}


def register(name: str):
    def _wrap(cls: type) -> type:
        SKETCHES[name] = cls
        cls.sketch_name = name
        return cls

    return _wrap
