"""Configuration models mirroring ``pprl_model``'s semantics
(``/root/reference/packages/pprl_model/pprl_model/mask.py``) as plain
dataclasses — pure metadata, cheaply pickled into Ray task/actor closures.

Defaults match the reference: ``prepend_attribute_name=True``, ``padding=""``
(``mask.py:123-129``), ``hardeners=[]``.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = [
    "HashFunctionConfig",
    "HashConfig",
    "CLKFilter",
    "RBFFilter",
    "CLKRBFFilter",
    "AttributeSalt",
    "AttributeConfig",
    "MaskConfig",
    "MatchConfig",
    "TransformConfig",
]


@dataclass(frozen=True)
class HashFunctionConfig:
    """``HashFunction`` (``mask.py:43-45``): chained algorithms, optional HMAC key."""

    algorithms: tuple[str, ...] = ("sha1",)
    key: str | None = None


@dataclass(frozen=True)
class HashConfig:
    """``HashConfig`` (``mask.py:48-50``)."""

    function: HashFunctionConfig = HashFunctionConfig()
    strategy: str = "double_hash"


@dataclass(frozen=True)
class CLKFilter:
    """``CLKFilter`` (``mask.py:59-62``)."""

    filter_size: int
    hash_values: int
    type: str = "clk"


@dataclass(frozen=True)
class RBFFilter:
    """``RBFFilter`` (``mask.py:65-68``)."""

    hash_values: int
    seed: int
    type: str = "rbf"


@dataclass(frozen=True)
class CLKRBFFilter:
    """``CLKRBFFilter`` (``mask.py:71-73``)."""

    hash_values: int
    type: str = "clkrbf"


@dataclass(frozen=True)
class AttributeSalt:
    """``AttributeSalt`` (``mask.py:130-144``): constant value XOR another
    attribute's value."""

    value: str | None = None
    attribute: str | None = None

    def __post_init__(self):
        if bool(self.value) == bool(self.attribute):
            raise ValueError("exactly one of value / attribute must be set")


@dataclass(frozen=True)
class AttributeConfig:
    """Static or weighted attribute config (``mask.py:147-158``). ``weight``
    and ``average_token_count`` are required for RBF / CLKRBF."""

    attribute_name: str
    salt: AttributeSalt | None = None
    weight: float | None = None
    average_token_count: float | None = None


@dataclass(frozen=True)
class MaskConfig:
    """``MaskConfig`` (``mask.py:123-129``) + the attribute list that rides on
    the request (``mask.py:162-168``). ``hardeners`` are config dicts tagged
    by ``name`` (see ``functions.harden.build_hardener_chain``)."""

    token_size: int
    hash: HashConfig
    filter: CLKFilter | RBFFilter | CLKRBFFilter
    prepend_attribute_name: bool = True
    padding: str = ""
    hardeners: tuple[dict, ...] = ()
    attributes: tuple[AttributeConfig, ...] = ()


@dataclass(frozen=True)
class MatchConfig:
    """``MatchConfig`` (``pprl_model/match.py:20-23``)."""

    measure: str = "dice"  # dice | cosine | jaccard
    threshold: float = 0.0
    method: str = "crosswise"  # crosswise | pairwise


@dataclass(frozen=True)
class TransformConfig:
    """``TransformConfig`` (``pprl_model/transform.py:16``): empty-value
    policy is one of ignore / error / skip."""

    empty_value: str = "error"
