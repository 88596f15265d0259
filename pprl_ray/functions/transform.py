"""String transformers, replicating ``pprl_core/transform.py`` and the chain
semantics of ``pprl_service/routers/transform.py``.

All transformers are ``str -> str`` closures composed into per-attribute
chains: global ``before`` chain -> attribute chain -> global ``after`` chain
(``routers/transform.py:129-145``), with the reference's empty-value policy
(``ignore`` / ``error`` / ``skip``, ``routers/transform.py:83-108``).

The one deliberate deviation: the reference runs ``unidecode`` inside
``normalize`` (``transform.py:34``); that package is unavailable, so we use
``phonetics.ascii_fold`` (NFKD + special-case table), identical on ASCII and
on all accented-Latin inputs in the reference test suite.
"""

from __future__ import annotations

import re
import string
import unicodedata
from datetime import datetime
from typing import Callable

from .phonetics import PHONETIC_ALGORITHMS, ascii_fold

__all__ = [
    "StringTransformFn",
    "character_filter",
    "normalize",
    "number",
    "date_time",
    "phonetic_code",
    "mapping",
    "build_transformer",
    "build_chain",
    "apply_chain",
]

StringTransformFn = Callable[[str], str]

_WS_RUN = re.compile(r"\s{2,}")


def character_filter(chars: str) -> StringTransformFn:
    """Drop every character contained in ``chars`` (``transform.py:24-28``)."""
    drop = set(chars)

    def _transform(s: str) -> str:
        return "".join(c for c in s if c not in drop)

    return _transform


def normalize() -> StringTransformFn:
    """ascii-fold -> NFKD -> lowercase -> collapse whitespace runs -> strip
    (``transform.py:31-46``)."""

    def _transform(s: str) -> str:
        s = ascii_fold(s)
        s = unicodedata.normalize("NFKD", s)
        s = s.lower()
        s = _WS_RUN.sub(" ", s)
        return s.strip()

    return _transform


def number(decimal_places: int) -> StringTransformFn:
    """Parse float, reformat with fixed decimal places (``transform.py:49-55``)."""
    fmt = f"{{:0.{decimal_places}f}}"

    def _transform(s: str) -> str:
        return fmt.format(float(s))

    return _transform


def date_time(input_format: str, output_format: str) -> StringTransformFn:
    """strptime/strftime reformat (``transform.py:58-62``)."""

    def _transform(s: str) -> str:
        return datetime.strptime(s, input_format).strftime(output_format)

    return _transform


def phonetic_code(algorithm: str) -> StringTransformFn:
    """Phonetic-code transformer; algorithm names per
    ``routers/transform.py:40-46``."""
    algos = PHONETIC_ALGORITHMS()
    if algorithm not in algos:
        raise ValueError(f"unimplemented phonetic code algorithm `{algorithm}`")
    algo = algos[algorithm]

    def _transform(s: str) -> str:
        return algo.phonetics(s)

    return _transform


def mapping(
    char_dict: dict[str, str], default_val: str | None = None, inline: bool = False
) -> StringTransformFn:
    """Whole-value lookup (with optional default), or inline non-overlapping
    substring replacement with overlap detection (``transform.py:83-146``).

    The inline variant scans every (source, target) pair in dict order,
    collects all occurrences left-to-right, errors if any two replacements
    overlap, then rebuilds the string with replacements applied in index
    order — matching the reference's algorithm exactly.
    """

    def _transform_default(s: str) -> str:
        out = char_dict.get(s, default_val)
        if out is None:
            raise ValueError(f"value `{s}` has no mapping, or no default value is present")
        return out

    def _transform_inline(s: str) -> str:
        pending: list[tuple[int, str, str]] = []
        taken = [False] * len(s)
        for source, target in char_dict.items():
            src_len = len(source)
            i = s.find(source, 0)
            while i != -1:
                if any(taken[i : i + src_len]):
                    raise ValueError(
                        f"cannot resolve inline mapping: replacement of `{source}` with "
                        f"`{target}` at index {i} overlaps"
                    )
                pending.append((i, source, target))
                for j in range(i, i + src_len):
                    taken[j] = True
                i = s.find(source, i + 1)

        if not pending:
            return s
        pending.sort(key=lambda r: r[0])
        out, i = [], 0
        for idx, source, target in pending:
            out.append(s[i:idx])
            out.append(target)
            i = idx + len(source)
        out.append(s[i:])
        return "".join(out)

    return _transform_inline if inline else _transform_default


# ---------------------------------------------------------------------------
# Config-driven chain construction (mirrors routers/transform.py:61-80,111-150)


def build_transformer(cfg: dict) -> StringTransformFn:
    """Build one transformer from a config dict with a ``name`` tag, mirroring
    the registry in ``routers/transform.py:61-68``.

    Names: character_filter, normalization, number, date_time, mapping,
    phonetic_code.
    """
    from ..config import validate_transformer_config

    validate_transformer_config(cfg)
    name = cfg["name"]
    if name == "character_filter":
        return character_filter(cfg.get("characters") or str(string.punctuation))
    if name == "normalization":
        return normalize()
    if name == "number":
        return number(cfg["decimal_places"])
    if name == "date_time":
        return date_time(cfg["input_format"], cfg["output_format"])
    if name == "mapping":
        return mapping(cfg["mapping"], cfg.get("default_value"), cfg.get("inline", False))
    if name == "phonetic_code":
        return phonetic_code(cfg["algorithm"])
    raise ValueError(f"unimplemented transformer `{name}`")


def build_chain(
    attribute_transformers: dict[str, list[dict]] | None = None,
    global_before: list[dict] | None = None,
    global_after: list[dict] | None = None,
) -> dict:
    """Resolve all transformer configs into callables once (per worker)."""
    return {
        "attr": {
            a: [build_transformer(c) for c in cfgs]
            for a, cfgs in (attribute_transformers or {}).items()
        },
        "before": [build_transformer(c) for c in (global_before or [])],
        "after": [build_transformer(c) for c in (global_after or [])],
    }


def apply_chain(chain: dict, attr: str, value: str, empty_value: str = "ignore") -> str:
    """Fold one attribute value through before -> attribute -> after chains
    with the reference's empty-value handling (``routers/transform.py:83-145``).

    ``empty_value``: ``ignore`` runs transformers anyway, ``error`` raises,
    ``skip`` passes empty strings through untouched. The check applies per
    transformer application, as in the reference.
    """
    fns = chain["before"] + chain["attr"].get(attr, []) + chain["after"]
    for fn in fns:
        if value == "":
            if empty_value == "error":
                raise ValueError("entity contains empty field")
            if empty_value == "skip":
                continue
        value = fn(value)
    return value
