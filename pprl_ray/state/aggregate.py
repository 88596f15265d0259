"""Sketch aggregation over Ray Data: partial-per-batch, salted two-level merge.

The scale contract (SURVEY.md §4): raw rows are NEVER shuffled. Stage 1 runs
inside ``map_batches`` and folds each Arrow batch into one sketch per group
key, emitting tiny ``(key, blob, rows)`` partial rows (zlib-compressed
serialized state — sketches over modest corpora are sparse). Only those
partials move through the ``groupby``; because every sketch merge is
associative + commutative, a salted intermediate merge level
(``groupby([key, salt])`` with ``salt = blob_hash % S``) bounds the fan-in on
hot keys (the skewed ``source`` column) before the final per-key merge.

Partial extraction is fully vectorised: the token ``list<int32>`` column is
flattened once via its Arrow offsets, token->row->key codes are computed with
``np.repeat``, and each group's tokens are gathered with one boolean mask.
"""

from __future__ import annotations

import zlib
from typing import Any, Callable

import numpy as np
import pyarrow as pa

__all__ = ["SketchPartials", "sketch_by_key", "merge_blob_rows", "finalize_sketches"]


def _flatten_list_column(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat_values, row_lengths) for a list<int> column, zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = col.values.to_numpy(zero_copy_only=False)
        lengths = np.diff(offsets)
        # honour a possible array-level slice offset
        return values[offsets[0] : offsets[-1]], lengths
    raise TypeError(f"expected list column, got {col.type}")


class SketchPartials:
    """``map_batches`` callable (actor-pool friendly): one sketch partial per
    (group key, batch). ``value_col`` may be a scalar column or list column
    (flattened); ``key_col=None`` aggregates globally under key ``""``."""

    def __init__(
        self,
        sketch_factory: Callable[[], Any],
        value_col: str,
        key_col: str | None = None,
        weight_col: str | None = None,
    ):
        self.sketch_factory = sketch_factory
        self.value_col = value_col
        self.key_col = key_col
        self.weight_col = weight_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.value_col]
        is_list = pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
        if is_list:
            values, lengths = _flatten_list_column(col)
        else:
            values = col.to_numpy(zero_copy_only=False)
            lengths = None

        keys_out: list[str] = []
        blobs_out: list[bytes] = []
        rows_out: list[int] = []

        if self.key_col is None:
            sk = self.sketch_factory()
            sk.update(values)
            keys_out.append("")
            blobs_out.append(zlib.compress(sk.to_bytes(), 1))
            rows_out.append(batch.num_rows)
        else:
            key_arr = batch[self.key_col].combine_chunks()
            if isinstance(key_arr, pa.ChunkedArray):
                key_arr = key_arr.combine_chunks()
            codes_arr = key_arr.dictionary_encode()
            codes = codes_arr.indices.to_numpy(zero_copy_only=False)
            uniques = codes_arr.dictionary.to_pylist()
            if lengths is not None:
                value_codes = np.repeat(codes, lengths)
            else:
                value_codes = codes
            for code, key in enumerate(uniques):
                sk = self.sketch_factory()
                sk.update(values[value_codes == code])
                keys_out.append(str(key))
                blobs_out.append(zlib.compress(sk.to_bytes(), 1))
                rows_out.append(int((codes == code).sum()))

        return pa.table(
            {
                "key": pa.array(keys_out, pa.string()),
                "blob": pa.array(blobs_out, pa.large_binary()),
                "rows": pa.array(rows_out, pa.int64()),
            }
        )


def _merge_group(df, sketch_cls) -> "Any":
    import pandas as pd

    blobs = df["blob"].tolist()
    sk = sketch_cls.from_bytes(zlib.decompress(blobs[0]))
    for b in blobs[1:]:
        sk = sk.merge(sketch_cls.from_bytes(zlib.decompress(b)))
    return pd.DataFrame(
        {
            "key": [df["key"].iloc[0]],
            "blob": [zlib.compress(sk.to_bytes(), 1)],
            "rows": [df["rows"].sum()],
        }
    )


def merge_blob_rows(partials_ds, sketch_cls, salt: int = 0):
    """Merge a Dataset of (key, blob, rows) partials down to one row per key.

    With ``salt > 0`` an intermediate ``groupby([key, salt])`` level first
    reduces fan-in per key (sketch merges are associative, so the two-level
    result is identical to a flat merge)."""

    if salt > 0:

        def _add_salt(batch: pa.Table) -> pa.Table:
            h = np.array([zlib.crc32(b) % salt for b in batch["blob"].to_pylist()], dtype=np.int64)
            return batch.append_column("salt", pa.array(h))

        salted = partials_ds.map_batches(_add_salt, batch_format="pyarrow")
        level1 = salted.groupby(["key", "salt"]).map_groups(
            lambda df: _merge_group(df, sketch_cls), batch_format="pandas"
        )
        partials_ds = level1.drop_columns(["salt"]) if "salt" in level1.schema().names else level1

    return partials_ds.groupby("key").map_groups(
        lambda df: _merge_group(df, sketch_cls), batch_format="pandas"
    )


def sketch_by_key(
    ds,
    sketch_factory: Callable[[], Any],
    value_col: str,
    key_col: str | None = None,
    *,
    salt: int = 0,
    batch_size: int = 65536,
    concurrency: int | None = None,
):
    """Full pipeline: Dataset -> one merged sketch row per key.

    Returns a Ray Dataset with schema (key: string, blob: binary, rows: int64)
    — consume with :func:`finalize_sketches` (small result)."""
    sketch_cls = type(sketch_factory())
    partials = ds.map_batches(
        SketchPartials(sketch_factory, value_col, key_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        **({"concurrency": concurrency} if concurrency else {}),
    )
    return merge_blob_rows(partials, sketch_cls, salt=salt)


def finalize_sketches(merged_ds, sketch_cls) -> dict[str, Any]:
    """Materialise the (tiny) merged sketch table into {key: sketch}."""
    out: dict[str, Any] = {}
    for row in merged_ds.take_all():
        out[row["key"]] = sketch_cls.from_bytes(zlib.decompress(row["blob"]))
    return out
