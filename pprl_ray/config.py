"""Configuration models mirroring ``pprl_model``'s semantics
(``/root/reference/packages/pprl_model/pprl_model/mask.py``) as plain
dataclasses — pure metadata, cheaply pickled into Ray task/actor closures.

Defaults match the reference: ``prepend_attribute_name=True``, ``padding=""``
(``mask.py:123-129``), ``hardeners=[]``.

Validation parity: the reference's pydantic constraint fields and custom
``model_validator``s (``mask.py:126-267``, gated by
``pprl_model/tests/test_custom_validation.py``) are ported as
``__post_init__`` checks with the same error messages, so an invalid config
fails fast at construction with an entity/attribute-naming error instead of
surfacing as a deep kernel error inside a Ray task.
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
    "validate_hardener_config",
    "validate_transformer_config",
    "validate_mask_columns",
]

HASH_ALGORITHMS = ("md5", "sha1", "sha256", "sha512")
HASH_STRATEGIES = ("double_hash", "triple_hash", "enhanced_double_hash", "random_hash")
HARDENERS = ("balance", "xor_fold", "permute", "randomized_response", "rule_90", "rehash")
TRANSFORMERS = ("normalization", "date_time", "character_filter", "mapping", "number", "phonetic_code")
PHONETIC_CODE_ALGORITHMS = ("soundex", "metaphone", "refined_soundex", "fuzzy_soundex", "cologne")


@dataclass(frozen=True)
class HashFunctionConfig:
    """``HashFunction`` (``mask.py:43-45``): chained algorithms, optional HMAC key."""

    algorithms: tuple[str, ...] = ("sha1",)
    key: str | None = None

    def __post_init__(self):
        if len(self.algorithms) < 1:
            raise ValueError("algorithms must contain at least 1 entry")
        for a in self.algorithms:
            if a not in HASH_ALGORITHMS:
                raise ValueError(
                    f"unknown hash algorithm `{a}`: must be one of {', '.join(HASH_ALGORITHMS)}"
                )


@dataclass(frozen=True)
class HashConfig:
    """``HashConfig`` (``mask.py:48-50``)."""

    function: HashFunctionConfig = HashFunctionConfig()
    strategy: str = "double_hash"

    def __post_init__(self):
        if self.strategy not in HASH_STRATEGIES:
            raise ValueError(
                f"unknown hash strategy `{self.strategy}`: must be one of {', '.join(HASH_STRATEGIES)}"
            )


@dataclass(frozen=True)
class CLKFilter:
    """``CLKFilter`` (``mask.py:59-62``): filter_size > 0, hash_values > 0."""

    filter_size: int
    hash_values: int
    type: str = "clk"

    def __post_init__(self):
        if self.filter_size <= 0:
            raise ValueError("filter_size must be greater than 0")
        if self.hash_values <= 0:
            raise ValueError("hash_values must be greater than 0")


@dataclass(frozen=True)
class RBFFilter:
    """``RBFFilter`` (``mask.py:65-68``): hash_values > 0."""

    hash_values: int
    seed: int
    type: str = "rbf"

    def __post_init__(self):
        if self.hash_values <= 0:
            raise ValueError("hash_values must be greater than 0")


@dataclass(frozen=True)
class CLKRBFFilter:
    """``CLKRBFFilter`` (``mask.py:71-73``): hash_values > 0."""

    hash_values: int
    type: str = "clkrbf"

    def __post_init__(self):
        if self.hash_values <= 0:
            raise ValueError("hash_values must be greater than 0")


@dataclass(frozen=True)
class AttributeSalt:
    """``AttributeSalt`` (``mask.py:130-144``): constant value XOR another
    attribute's value — mutually exclusive, one required (same messages as
    the reference validators)."""

    value: str | None = None
    attribute: str | None = None

    def __post_init__(self):
        if self.value and self.attribute:
            raise ValueError("value and attribute cannot be set at the same time")
        if not self.value and not self.attribute:
            raise ValueError("neither value nor attribute is set")


@dataclass(frozen=True)
class AttributeConfig:
    """Static or weighted attribute config (``mask.py:147-158``). Static =
    neither ``weight`` nor ``average_token_count``; weighted = BOTH, each
    > 0 (reference ``confloat(gt=0)``)."""

    attribute_name: str
    salt: AttributeSalt | None = None
    weight: float | None = None
    average_token_count: float | None = None

    def __post_init__(self):
        if (self.weight is None) != (self.average_token_count is None):
            raise ValueError(
                f"attribute `{self.attribute_name}`: weight and average_token_count "
                f"must be set together (weighted) or both omitted (static)"
            )
        if self.weight is not None and self.weight <= 0:
            raise ValueError(f"attribute `{self.attribute_name}`: weight must be greater than 0")
        if self.average_token_count is not None and self.average_token_count <= 0:
            raise ValueError(
                f"attribute `{self.attribute_name}`: average_token_count must be greater than 0"
            )

    @property
    def is_weighted(self) -> bool:
        return self.weight is not None


def validate_hardener_config(cfg: dict) -> None:
    """Constraint checks for one hardener config dict (reference
    ``mask.py:88-115``: permute/randomized_response need seeds,
    probability in [0,1], rehash window_size in (0,32], step/samples > 0)."""
    name = cfg.get("name")
    if name not in HARDENERS:
        raise ValueError(f"unknown hardener `{name}`: must be one of {', '.join(HARDENERS)}")
    if name == "permute" and "seed" not in cfg:
        raise ValueError("`permute` hardener requires a seed")
    if name == "randomized_response":
        if "seed" not in cfg:
            raise ValueError("`randomized_response` hardener requires a seed")
        p = cfg.get("probability")
        if p is None or not (0 <= p <= 1):
            raise ValueError("`randomized_response` probability must be between 0 and 1")
    if name == "rehash":
        ws = cfg.get("window_size", 0)
        if not (0 < ws <= 32):
            raise ValueError("`rehash` window_size must be in (0, 32]")
        if cfg.get("window_step", 0) <= 0:
            raise ValueError("`rehash` window_step must be greater than 0")
        if cfg.get("samples", 0) <= 0:
            raise ValueError("`rehash` samples must be greater than 0")


def validate_transformer_config(cfg: dict) -> None:
    """Constraint checks for one transformer config dict (reference
    ``transform.py:29-72``)."""
    name = cfg.get("name")
    if name not in TRANSFORMERS:
        raise ValueError(f"unknown transformer `{name}`: must be one of {', '.join(TRANSFORMERS)}")
    if name == "date_time":
        if not cfg.get("input_format") or not cfg.get("output_format"):
            raise ValueError("`date_time` transformer requires input_format and output_format")
    if name == "mapping":
        mapping = cfg.get("mapping")
        if not isinstance(mapping, dict) or len(mapping) < 1:
            raise ValueError("`mapping` transformer requires a mapping with at least 1 entry")
    if name == "number":
        if cfg.get("decimal_places", -1) < 0:
            raise ValueError("`number` decimal_places must be greater than or equal to 0")
    if name == "phonetic_code":
        alg = cfg.get("algorithm")
        if alg not in PHONETIC_CODE_ALGORITHMS:
            raise ValueError(
                f"unknown phonetic algorithm `{alg}`: must be one of "
                f"{', '.join(PHONETIC_CODE_ALGORITHMS)}"
            )


@dataclass(frozen=True)
class MaskConfig:
    """``MaskConfig`` (``mask.py:123-129``) + the attribute list that rides on
    the request (``mask.py:162-168``). ``hardeners`` are config dicts tagged
    by ``name`` (see ``functions.harden.build_hardener_chain``).

    Cross-field parity with ``EntityMaskRequest.validate_attribute_type``
    (``mask.py:172-195``): clk filters take static attribute configs only;
    rbf/clkrbf filters REQUIRE weighted ones."""

    token_size: int
    hash: HashConfig
    filter: CLKFilter | RBFFilter | CLKRBFFilter
    prepend_attribute_name: bool = True
    padding: str = ""
    hardeners: tuple[dict, ...] = ()
    attributes: tuple[AttributeConfig, ...] = ()

    def __post_init__(self):
        if self.token_size <= 1:
            raise ValueError("token_size must be greater than 1")
        for h in self.hardeners:
            validate_hardener_config(h)
        ftype = self.filter.type
        if ftype == "clk":
            if any(a.is_weighted for a in self.attributes):
                raise ValueError(
                    "`clk` filters require static attribute configurations, "
                    "but weighted ones were found"
                )
        else:
            if len(self.attributes) == 0:
                raise ValueError(
                    f"`{ftype}` filters require weighted attribute configurations, "
                    f"but none were found"
                )
            if not all(a.is_weighted for a in self.attributes):
                raise ValueError(
                    f"`{ftype}` filters require weighted attribute configurations, "
                    f"but static ones were found"
                )


def validate_mask_columns(config: MaskConfig, columns: list[str]) -> None:
    """Dataset-level parity with the reference's per-entity presence checks
    (``mask.py:197-263``): every configured attribute and salt attribute
    must exist as a column of the entity dataset."""
    missing = [
        a.attribute_name for a in config.attributes if a.attribute_name not in columns
    ]
    if missing:
        raise ValueError(
            "some configured attributes are not present on entities: "
            + ", ".join(f"`{m}`" for m in missing)
        )
    missing_salts = [
        a.salt.attribute
        for a in config.attributes
        if a.salt is not None and a.salt.attribute is not None and a.salt.attribute not in columns
    ]
    if missing_salts:
        raise ValueError(
            "some configured attribute salts are not present on entities: "
            + ", ".join(f"`{m}`" for m in missing_salts)
        )


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

    def __post_init__(self):
        if self.empty_value not in ("ignore", "error", "skip"):
            raise ValueError(
                f"unknown empty_value handling `{self.empty_value}`: "
                f"must be one of ignore, error, skip"
            )
