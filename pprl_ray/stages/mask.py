"""Ray Data stages for the PPRL pipelines: transform -> encode(mask) -> match.

Each stage is a callable class intended for
``ds.map_batches(Cls, fn_constructor_kwargs=..., concurrency=N,
batch_format="pyarrow")`` — construction (config compilation, transformer
chain resolution, caches) happens once per actor, work happens per batch.

Replaces the reference's HTTP request/response hops
(``pprl_client/cli.py:334-357`` -> POST /transform|/mask|/match) with
streaming Dataset stages; config travels in the actor constructor instead of
with every request.
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa

from ..config import MaskConfig
from ..functions.encode import MaskEncoder
from ..functions.transform import apply_chain, build_chain

__all__ = ["TransformStage", "EncodeStage", "decode_b64_column", "transform_entities", "mask_entities"]


class TransformStage:
    """Fused per-attribute transformer chains over string columns
    (semantics of ``routers/transform.py:111-150``).

    ``attribute_transformers``: {column -> [transformer config dicts]};
    global ``before`` / ``after`` chains apply to every configured column
    (to *all* columns except ``id_column`` if ``columns`` is None, matching
    the reference's every-attribute iteration)."""

    def __init__(
        self,
        attribute_transformers: dict[str, list[dict]] | None = None,
        global_before: list[dict] | None = None,
        global_after: list[dict] | None = None,
        empty_value: str = "error",
        columns: list[str] | None = None,
        id_column: str = "id",
    ):
        self.chain = build_chain(attribute_transformers, global_before, global_after)
        self.empty_value = empty_value
        self.columns = columns
        self.id_column = id_column
        self._cache: dict[tuple[str, str], str] = {}

    def _transform_value(self, col: str, value: str) -> str:
        key = (col, value)
        out = self._cache.get(key)
        if out is None:
            out = apply_chain(self.chain, col, value, self.empty_value)
            if len(self._cache) < 1_000_000:
                self._cache[key] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns
        if cols is None:
            cols = [c for c in batch.column_names if c != self.id_column]
        arrays = {}
        for name in batch.column_names:
            if name in cols:
                values = batch[name].to_pylist()
                arrays[name] = pa.array(
                    [self._transform_value(name, v if v is not None else "") for v in values],
                    pa.string(),
                )
            else:
                arrays[name] = batch[name]
        return pa.table(arrays)


class EncodeStage:
    """Mask a batch of entities into bit vectors: output schema
    ``(id: string, value: string)`` with base64 values byte-identical to the
    reference's ``bits.to_base64`` edge format (``routers/mask.py:402-410``).

    ``attribute_columns=None`` encodes every non-id column (the reference
    masks every attribute on the entity, ``routers/mask.py:221``).

    ``on_error``: the reference turns a bad record (e.g. a value yielding
    zero tokens, ``routers/mask.py:194-200``) into an HTTP 400 naming the
    entity. ``"raise"`` (default) maps that to fail-fast (the error message
    carries the entity id); ``"quarantine"`` keeps the job alive: output
    gains an ``error`` column, failed rows get ``value=""`` and the
    reference-formatted message, and the caller routes them to a quarantine
    sink with one filter."""

    def __init__(
        self,
        config: MaskConfig,
        id_column: str = "id",
        attribute_columns: list[str] | None = None,
        on_error: str = "raise",
    ):
        self.encoder = MaskEncoder(config)
        self.id_column = id_column
        self.attribute_columns = attribute_columns
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"unknown on_error mode {on_error!r}")
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.attribute_columns
        if cols is None:
            cols = [c for c in batch.column_names if c != self.id_column]
        ids = [str(v) for v in batch[self.id_column].to_pylist()]
        attrs = {c: ["" if v is None else str(v) for v in batch[c].to_pylist()] for c in cols}
        if self.on_error == "raise":
            packed, _ = self.encoder.encode(ids, attrs)
            return pa.table(
                {"id": pa.array(ids, pa.string()), "value": b64_encode_rows(packed)}
            )

        # quarantine: fast path first; only a failing batch pays the
        # per-entity retry that pinpoints the bad rows
        try:
            packed, _ = self.encoder.encode(ids, attrs)
            values = b64_encode_rows(packed)
            errors = [""] * len(ids)
        except ValueError:
            values, errors = [], []
            for i, eid in enumerate(ids):
                try:
                    row_packed, _ = self.encoder.encode([eid], {c: [attrs[c][i]] for c in cols})
                    values.append(base64.b64encode(row_packed[0].tobytes()).decode())
                    errors.append("")
                except ValueError as exc:
                    values.append("")
                    errors.append(str(exc))
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "value": values if isinstance(values, pa.Array)
                else pa.array(values, pa.string()),
                "error": pa.array(errors, pa.string()),
            }
        )


_B64_LUT = np.frombuffer(
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/",
    dtype=np.uint8,
)


def b64_encode_rows(packed: np.ndarray) -> pa.StringArray:
    """Vectorized base64 of a fixed-width (rows, nbytes) uint8 matrix —
    byte-identical to per-row ``base64.b64encode`` (RFC 4648 with '='
    padding) but with zero per-row Python: 24-bit triplet packing and a
    64-entry LUT over the whole matrix, then ONE arrow StringArray built
    from the contiguous char buffer with arithmetic offsets."""
    n, w = packed.shape
    if n == 0 or w == 0:
        return pa.array([""] * n, pa.string())
    pad = (-w) % 3
    if pad:
        packed = np.concatenate(
            [packed, np.zeros((n, pad), dtype=np.uint8)], axis=1
        )
    t = packed.reshape(n, -1, 3).astype(np.uint32)
    v = (t[:, :, 0] << 16) | (t[:, :, 1] << 8) | t[:, :, 2]
    idx = np.stack(
        [(v >> 18) & 63, (v >> 12) & 63, (v >> 6) & 63, v & 63], axis=2
    ).reshape(n, -1)
    chars = _B64_LUT[idx]
    if pad:
        chars[:, -pad:] = ord("=")
    row_len = chars.shape[1]
    offsets = np.arange(0, (n + 1) * row_len, row_len, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n,
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(np.ascontiguousarray(chars).tobytes()),
    )


def decode_b64_column(values: list[str]) -> np.ndarray:
    """Decode a base64 bit-vector column into a packed (rows, nbytes) uint8
    matrix (all rows must share one width, as reference matching assumes)."""
    raws = [base64.b64decode(v.encode()) for v in values]
    if not raws:
        return np.zeros((0, 0), dtype=np.uint8)
    width = len(raws[0])
    for r in raws:
        if len(r) != width:
            raise ValueError("bit vectors have differing widths")
    return np.frombuffer(b"".join(raws), dtype=np.uint8).reshape(len(raws), width)


# -- convenience pipeline wrappers ------------------------------------------


def transform_entities(ds, attribute_transformers=None, global_before=None, global_after=None,
                       empty_value: str = "error", id_column: str = "id", **map_kwargs):
    # request-level parity with the reference's EntityTransformRequest
    # validator (pprl_model/transform.py:90-95): reject empty chains and
    # bad transformer configs on the driver, not deep inside a Ray task
    from ..config import validate_transformer_config

    all_cfgs = [c for cfgs in (attribute_transformers or {}).values() for c in cfgs]
    all_cfgs += list(global_before or []) + list(global_after or [])
    if not all_cfgs:
        raise ValueError("attribute and global transformers are empty: must contain at least one")
    for cfg in all_cfgs:
        validate_transformer_config(cfg)
    # actor pool on purpose: TransformStage memoizes (column, value) ->
    # transformed value ACROSS batches, which pays off on low-cardinality
    # attribute columns; autoscale rather than pin the pool size
    map_kwargs.setdefault("concurrency", (1, 8))
    return ds.map_batches(
        TransformStage,
        fn_constructor_kwargs=dict(
            attribute_transformers=attribute_transformers,
            global_before=global_before,
            global_after=global_after,
            empty_value=empty_value,
            id_column=id_column,
        ),
        batch_format="pyarrow",
        **map_kwargs,
    )


def mask_entities(ds, config: MaskConfig, id_column: str = "id",
                  attribute_columns: list[str] | None = None, on_error: str = "raise",
                  **map_kwargs):
    # dataset-level parity with the reference's per-entity attribute /
    # salt-attribute presence validators (pprl_model/mask.py:197-263)
    from ..config import validate_mask_columns

    validate_mask_columns(config, list(ds.schema().names))
    # stateless kernel (config compiled per task, trivial cost): plain task
    # pool so encoding scales to every cluster core with no actor startup
    map_kwargs.setdefault("batch_size", 4096)
    return ds.map_batches(
        EncodeStage(config, id_column=id_column, attribute_columns=attribute_columns,
                    on_error=on_error),
        batch_format="pyarrow",
        **map_kwargs,
    )
