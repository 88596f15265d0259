"""CLK / RBF / CLKRBF batch encoders.

Replicates the per-entity semantics of ``pprl_service/routers/mask.py``:

- CLK (``mask.py:203-235``): fixed-size filter; per attribute: salt resolve ->
  tokenize -> optional ``attr_name + token`` prepend -> hash -> set k bits.
- CLKRBF (``mask.py:238-289``): per-attribute hash count
  ``ceil(base * w / min_w)``; filter size
  ``optimal_size(0.5, sum(k_a * avg_tokens_a))``.
- RBF (``mask.py:292-382``): per-attribute filter of
  ``optimal_size(0.5, avg_tokens * k)``; parent size = max over attributes of
  ``ceil(attr_size * total_w / w)``; a *single* ``Random(seed)`` shared across
  attributes in sorted-attribute order samples ``floor(w/total_w * parent)``
  indices per attribute, copying set bits into the parent at a running offset.

Scale design (what makes this Ray-Data-first rather than a port):

- The RBF sampling sequence depends only on the config — never on entity
  data — so the sampled indices and their folded parent positions are
  precomputed once per encoder (per actor) and applied to whole batches with
  numpy fancy indexing.
- Token -> bit-index mappings are pure functions of (salt+token, config);
  they are memoised per worker (`value -> indices` whole-value cache), which
  collapses the dominant hashlib cost because attribute values and q-grams
  repeat heavily across rows.
- Output is a packed ``(rows, nbytes)`` uint8 matrix; hardeners run as fused
  2-D vector ops on the unpacked batch (see ``functions.harden``).
"""

from __future__ import annotations

import math

import numpy as np

from ..config import AttributeConfig, MaskConfig
from .bitvec import fold_indices, optimal_size, pack_rows
from .harden import build_hardener_chain
from .qgram import indices_for_value, resolve_hash_fn, tokenize

__all__ = ["MaskEncoder"]


class _TokenIndexer:
    """Memoised (salted value -> all folded bit indices) resolver for one
    attribute under one config."""

    def __init__(self, attr_name: str, hash_fn, strategy: str, hash_values: int, nbits: int,
                 token_size: int, padding: str, prepend_attribute_name: bool):
        self.attr_name = attr_name
        self.hash_fn = hash_fn
        self.strategy = strategy
        self.k = hash_values
        self.nbits = nbits
        self.q = token_size
        self.padding = padding
        self.prepend = prepend_attribute_name
        self._cache: dict[tuple[str, str], np.ndarray] = {}

    def indices(self, entity_id: str, salt: str, value: str) -> np.ndarray:
        key = (salt, value)
        idx = self._cache.get(key)
        if idx is None:
            tokens = tokenize(value, self.q, self.padding)
            if not tokens:
                raise ValueError(
                    f"value for `{self.attr_name}` on entity with ID `{entity_id}` did not "
                    f"produce any tokens - decrease the token size or add sufficient padding"
                )
            parts = []
            for token in tokens:
                if self.prepend:
                    token = self.attr_name + token
                parts.append(
                    indices_for_value(salt + token, self.hash_fn, self.strategy, self.k, self.nbits)
                )
            idx = np.concatenate(parts)
            if len(self._cache) < 1_000_000:  # bound per-actor memory
                self._cache[key] = idx
        return idx


def _fill_bits(
    bits: np.ndarray,
    indexer: _TokenIndexer,
    ids: list[str],
    values: list[str],
    salts: list[str] | str,
) -> None:
    """Set every token bit of one attribute column into the (rows, nbits)
    unpacked matrix with a single fancy assignment."""
    n = len(values)
    static_salt = isinstance(salts, str)
    row_ids: list[np.ndarray] = []
    col_ids: list[np.ndarray] = []
    for r in range(n):
        salt = salts if static_salt else salts[r]
        idx = indexer.indices(ids[r], salt, values[r])
        col_ids.append(idx)
        row_ids.append(np.full(len(idx), r, dtype=np.int64))
    if col_ids:
        bits[np.concatenate(row_ids), np.concatenate(col_ids)] = 1


class MaskEncoder:
    """Config-compiled batch encoder: ``encode(ids, attrs) -> (packed, nbits)``.

    ``attrs`` is an ordered mapping ``attribute_name -> list[str]`` (column
    oriented, as sliced from an Arrow batch). Encoding + the hardener chain
    run fully vectorised per batch; the output is a packed uint8 matrix with
    one row per entity plus the final bit width.
    """

    def __init__(self, config: MaskConfig):
        self.config = config
        self.hash_fn = resolve_hash_fn(config.hash.function.algorithms, config.hash.function.key)
        self.strategy = config.hash.strategy
        self.harden = build_hardener_chain([dict(h) for h in config.hardeners])
        self.attr_configs: dict[str, AttributeConfig] = {
            a.attribute_name: a for a in config.attributes
        }
        ftype = config.filter.type
        self._indexers: dict[str, _TokenIndexer] = {}

        if ftype == "clk":
            self.nbits = config.filter.filter_size
            self._attr_k = lambda name: config.filter.hash_values
        elif ftype == "clkrbf":
            weights = {a.attribute_name: a.weight for a in config.attributes}
            min_w = min(weights.values())
            base = config.filter.hash_values
            self._k_by_attr = {
                name: int(math.ceil(base * w / min_w)) for name, w in weights.items()
            }
            total = sum(
                self._k_by_attr[a.attribute_name] * a.average_token_count
                for a in config.attributes
            )
            self.nbits = optimal_size(0.5, total)
            self._attr_k = lambda name: self._k_by_attr[name]
        elif ftype == "rbf":
            self._init_rbf(config)
        else:
            raise ValueError(f"unimplemented filter type `{ftype}`")

    # -- RBF precomputation (config-only, shared across all rows) ------------

    def _init_rbf(self, config: MaskConfig) -> None:
        from random import Random

        k = config.filter.hash_values
        attrs = config.attributes
        total_w = sum(a.weight for a in attrs)
        self._rbf_sizes = {
            a.attribute_name: optimal_size(0.5, a.average_token_count * k) for a in attrs
        }
        self._sorted_attrs = sorted(a.attribute_name for a in attrs)
        parent = max(
            int(math.ceil(self._rbf_sizes[a.attribute_name] * total_w / a.weight)) for a in attrs
        )
        self.nbits = parent
        self._attr_k = lambda name: k

        # one shared RNG in sorted-attribute order — identical for every entity
        rng = Random(config.filter.seed)
        offset = 0
        self._rbf_sampling: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for name in self._sorted_attrs:
            attr_cfg = self.attr_configs[name]
            attr_size = self._rbf_sizes[name]
            s = int(math.floor(attr_cfg.weight / total_w * parent))
            sampled = np.array([rng.randrange(attr_size) for _ in range(s)], dtype=np.int64)
            parent_pos = fold_indices(offset + sampled, parent)
            self._rbf_sampling[name] = (sampled, parent_pos)
            offset += s

    # -- helpers -------------------------------------------------------------

    def _indexer(self, attr_name: str, nbits: int) -> _TokenIndexer:
        ix = self._indexers.get(attr_name)
        if ix is None:
            c = self.config
            ix = self._indexers[attr_name] = _TokenIndexer(
                attr_name, self.hash_fn, self.strategy, self._attr_k(attr_name), nbits,
                c.token_size, c.padding, c.prepend_attribute_name,
            )
        return ix

    def _salts(self, attr_name: str, attrs: dict[str, list[str]], n: int) -> list[str] | str:
        """Per-attribute salt: constant, drawn from another attribute's value,
        or empty (``routers/mask.py:124-136``)."""
        cfg = self.attr_configs.get(attr_name)
        if cfg is None or cfg.salt is None:
            return ""
        if cfg.salt.value is not None:
            return cfg.salt.value
        return attrs[cfg.salt.attribute]

    # -- encode --------------------------------------------------------------

    def encode(self, ids: list[str], attrs: dict[str, list[str]]) -> tuple[np.ndarray, int]:
        n = len(ids)
        if self.config.filter.type == "rbf":
            bits = self._encode_rbf(ids, attrs, n)
        else:
            bits = np.zeros((n, self.nbits), dtype=np.uint8)
            for attr_name, values in attrs.items():
                _fill_bits(bits, self._indexer(attr_name, self.nbits), ids, values,
                           self._salts(attr_name, attrs, n))
        bits = self.harden(bits)
        return pack_rows(bits), bits.shape[1]

    def _encode_rbf(self, ids: list[str], attrs: dict[str, list[str]], n: int) -> np.ndarray:
        parent = np.zeros((n, self.nbits), dtype=np.uint8)
        rows = np.arange(n, dtype=np.int64)[:, None]
        for name in self._sorted_attrs:
            attr_size = self._rbf_sizes[name]
            attr_bits = np.zeros((n, attr_size), dtype=np.uint8)
            _fill_bits(attr_bits, self._indexer(name, attr_size), ids, attrs[name],
                       self._salts(name, attrs, n))
            sampled, parent_pos = self._rbf_sampling[name]
            if len(sampled):
                # OR because folded parent positions may collide
                np.bitwise_or.at(parent, (rows, parent_pos[None, :]), attr_bits[:, sampled])
        return parent
