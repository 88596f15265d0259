"""Sketch aggregation over Ray Data: partial-per-batch, combiner-tree merge.

The scale contract (SURVEY.md §4): raw rows are NEVER shuffled. Stage 1 runs
inside ``map_batches`` and folds each Arrow batch into one sketch per group
key, emitting tiny ``(key, blob, rows)`` partial rows (zlib-compressed
serialized state). Because every sketch merge is associative + commutative,
the default merge is an iterative parallel COMBINER tree over the
materialized partial rows (bundled map tasks, no sort-based shuffle): a hot
key collapses to one row per combiner task, so skew never concentrates on a
single reducer. A ``groupby``-based topology (optionally two-level salted:
``groupby([key, salt])`` with ``salt = blob_hash % S``) remains available
for writing exactly-one-row-per-key sketch tables and is property-tested
equivalent.

Partial extraction is fully vectorised: the token ``list<int32>`` column is
flattened once via its Arrow offsets, token->row->key codes are computed with
``np.repeat``, and each group's tokens are gathered with one boolean mask.
"""

from __future__ import annotations

import zlib
from typing import Any, Callable

import numpy as np
import pyarrow as pa

__all__ = [
    "SketchPartials",
    "sketch_by_key",
    "weighted_sketch_by_key",
    "merge_blob_rows",
    "finalize_sketches",
    "sketch_estimate_table",
]


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
        weights = None
        if self.weight_col is not None:
            if is_list:
                raise ValueError("weight_col requires a scalar value column")
            weights = batch[self.weight_col].to_numpy(zero_copy_only=False)

        def _update(sk, mask=None):
            if weights is None:
                sk.update(values if mask is None else values[mask])
            else:
                sk.update(values if mask is None else values[mask],
                          weights if mask is None else weights[mask])

        keys_out: list[str] = []
        blobs_out: list[bytes] = []
        rows_out: list[int] = []

        if self.key_col is None:
            sk = self.sketch_factory()
            _update(sk)
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
                _update(sk, value_codes == code)
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

    # canonical merge order: a distributed groupby delivers within-key rows
    # in SCHEDULING-dependent order (sort ties break by block arrival), and
    # KLL/t-digest merges are only order-invariant within their error bound
    # — sorting the blobs first makes the merged result bit-reproducible
    # under any scheduling/load (order-invariant sketches are unaffected)
    blobs = sorted(df["blob"].tolist())
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


def _combine_batch(batch: pa.Table, sketch_cls) -> pa.Table:
    """Local combiner: merge per-key partials WITHIN one bundled batch of
    partial rows (no shuffle). Each combiner task emits at most one row per
    key regardless of skew, bounding the final groupby's per-key fan-in to
    the number of combiner tasks."""
    merged: dict[str, Any] = {}
    rowsum: dict[str, int] = {}
    # canonical (key, blob) order before merging: the bundled batch is
    # assembled from partial blocks in ARRIVAL order (load-dependent), and
    # KLL/t-digest merges are only order-invariant within their error bound
    # — same rule as _merge_group / the k-means driver reduce
    rows = sorted(
        zip(
            batch["key"].to_pylist(), batch["blob"].to_pylist(), batch["rows"].to_pylist()
        )
    )
    for key, blob, r in rows:
        sk = sketch_cls.from_bytes(zlib.decompress(blob))
        if key in merged:
            merged[key] = merged[key].merge(sk)
            rowsum[key] += r
        else:
            merged[key] = sk
            rowsum[key] = r
    ks = sorted(merged)
    return pa.table(
        {
            "key": pa.array(ks, pa.string()),
            "blob": pa.array([zlib.compress(merged[k].to_bytes(), 1) for k in ks], pa.large_binary()),
            "rows": pa.array([rowsum[k] for k in ks], pa.int64()),
        }
    )


def _merge_runs(df, sketch_cls, by):
    """Merge EVERY key co-located in one partition in a single pass: sort
    into canonical (by..., blob) order, then one merge-run per distinct
    ``by`` tuple. One function call per PARTITION (not per key) — the
    high-cardinality-safe reducer: 10^6 keys cost a sort + one Python scan,
    not 10^6 group dispatches. Output bytes are identical to the per-key
    :func:`_merge_group` path (same canonical blob order per key)."""
    import pandas as pd

    df = df.sort_values([*by, "blob"], kind="stable")
    key_cols = [df[c].tolist() for c in by]
    blobs = df["blob"].tolist()
    rows = df["rows"].tolist()

    out: dict[str, list] = {c: [] for c in by}
    out_blobs: list[bytes] = []
    out_rows: list[int] = []
    cur = None
    cur_sk = None
    cur_rows = 0
    for i in range(len(blobs)):
        tup = tuple(col[i] for col in key_cols)
        sk = sketch_cls.from_bytes(zlib.decompress(blobs[i]))
        if tup == cur:
            cur_sk = cur_sk.merge(sk)
            cur_rows += rows[i]
        else:
            if cur is not None:
                for c, v in zip(by, cur):
                    out[c].append(v)
                out_blobs.append(zlib.compress(cur_sk.to_bytes(), 1))
                out_rows.append(cur_rows)
            cur, cur_sk, cur_rows = tup, sk, rows[i]
    if cur is not None:
        for c, v in zip(by, cur):
            out[c].append(v)
        out_blobs.append(zlib.compress(cur_sk.to_bytes(), 1))
        out_rows.append(cur_rows)
    out["blob"] = out_blobs
    out["rows"] = out_rows
    return pd.DataFrame(out)


def merge_blob_rows(partials_ds, sketch_cls, salt: int = 0,
                    combine_batch_size: int | None = 4096,
                    partitions: int = 32):
    """Merge a Dataset of (key, blob, rows) partials down to one row per key.

    Topology: a local combiner map (bundles many partial blocks per task,
    merges within the bundle, no shuffle), then ONE hash-partitioned
    exchange — keys co-locate by ``crc32(key) % partitions`` and each
    partition group merges ALL its keys in a single sorted pass
    (:func:`_merge_runs`), so reduce cost scales with partition count, not
    key cardinality (one group dispatch per partition even at millions of
    keys). With ``salt > 0`` an intermediate level first merges
    ``(key, blob-hash % salt)`` sub-groups, spreading a hot key's fan-in
    across ``salt`` sub-reducers; sketch merges are associative, so every
    topology yields an identical result (tested)."""

    if combine_batch_size:
        partials_ds = partials_ds.map_batches(
            lambda b: _combine_batch(b, sketch_cls),
            batch_format="pyarrow",
            batch_size=combine_batch_size,
        )

    def _add_part(batch: pa.Table) -> pa.Table:
        h = np.array(
            [zlib.crc32(k.encode()) % partitions for k in batch["key"].to_pylist()],
            dtype=np.int64,
        )
        return batch.append_column("part", pa.array(h))

    if salt > 0:

        def _add_salt(batch: pa.Table) -> pa.Table:
            s = np.array(
                [zlib.crc32(b) % salt for b in batch["blob"].to_pylist()],
                dtype=np.int64,
            )
            return _add_part(batch).append_column("salt", pa.array(s))

        level1 = (
            partials_ds.map_batches(_add_salt, batch_format="pyarrow")
            .groupby(["part", "salt"])
            .map_groups(
                lambda df: _merge_runs(df, sketch_cls, ["key", "salt"]),
                batch_format="pandas",
            )
        )
        partials_ds = level1.drop_columns(["salt"])

    # _merge_runs emits only (by..., blob, rows) — the grouping "part"
    # column never appears in its output, so nothing to drop here.
    return (
        partials_ds.map_batches(_add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda df: _merge_runs(df, sketch_cls, ["key"]), batch_format="pandas"
        )
    )


def sketch_by_key(
    ds,
    sketch_factory: Callable[[], Any],
    value_col: str,
    key_col: str | None = None,
    *,
    weight_col: str | None = None,
    merge: str | None = "combine",
    salt: int = 0,
    batch_size: int | None = None,
    combine_batch_size: int = 256,
    concurrency: int | None = None,
):
    """Full pipeline: Dataset -> (key, blob, rows) sketch rows; consume with
    :func:`finalize_sketches` (small result; merges per-key duplicates).

    ``merge="combine"`` (default): materialize the tiny per-block partial
    rows (aggregate state only — the input stream stays fully pipelined),
    then merge them with bundled combiner map tasks; no sort-based shuffle.
    A hot key collapses to one row per combiner task, so skew never
    concentrates on a single reducer. ``merge="groupby"`` produces exactly
    one row per key via a groupby shuffle (``salt`` adds a two-level salted
    reduce) — use when the sketch table itself is the output (e.g. written
    to Parquet). ``merge=None`` returns raw per-block partials.

    Determinism: every combiner/reducer sorts its (key, blob) inputs into
    canonical order before merging, so results are bit-reproducible under
    any scheduling/load while the partial rows fit one combiner bundle
    (every pinned sf0.01 oracle does). Once the tree-reduce loop engages,
    bundle BOUNDARIES follow block arrival, so order-sensitive sketches
    (KLL/t-digest) are then reproducible only within their published error
    bound — exactly-mergeable sketches (HLL/CMS/Bloom/theta/...) stay
    bit-identical under every topology (property-tested)."""
    sketch_cls = type(sketch_factory())
    partials = ds.map_batches(
        SketchPartials(sketch_factory, value_col, key_col, weight_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        **({"concurrency": concurrency} if concurrency else {}),
    )
    if salt > 0:
        merge = "groupby"  # salting only exists in the groupby topology
    if merge == "combine":
        # iterative parallel tree-reduce over the materialized partial rows
        # (aggregate state only; the input stream stays fully pipelined)
        combine = lambda b: _combine_batch(b, sketch_cls)  # noqa: E731
        partials = partials.materialize()
        while partials.count() > 8 * combine_batch_size:
            partials = partials.map_batches(
                combine, batch_format="pyarrow", batch_size=combine_batch_size
            ).materialize()
        return partials.map_batches(
            combine, batch_format="pyarrow", batch_size=combine_batch_size
        )
    if merge == "groupby":
        return merge_blob_rows(partials, sketch_cls, salt=salt)
    if merge is None:
        return partials
    raise ValueError(f"unknown merge mode {merge!r}")


def weighted_sketch_by_key(
    ds,
    sketch_factory: Callable[[], Any],
    value_col: str,
    key_col: str,
    *,
    partitions: int = 32,
):
    """Count-weighted sketch per key for sketches whose merge contract
    needs each item's FINAL weight presented once (e.g.
    ``WeightedMinHashSketch``): fuses the count aggregation and the
    sketch-partial extraction into ONE value-partitioned exchange instead
    of a full sort-aggregate followed by a separate partial pass.

    Per batch, a polars groupby pre-combines ``(key, value)`` counts
    (map-side combine — the exchange carries at most one row per distinct
    pair per block); rows then co-locate by ``hash(value) % partitions``,
    so each reduce group holds a DISJOINT value range with every partial
    count for it. The group task finishes the counts and folds them
    straight into one sketch partial per key — value-disjointness is
    exactly the weighted-merge contract. Consume with
    :func:`finalize_sketches`."""
    import polars as pl

    def _precount(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame(
            {
                "k": pl.from_arrow(batch[key_col].combine_chunks()),
                "v": pl.from_arrow(batch[value_col].combine_chunks()),
            }
        )
        g = df.group_by(["k", "v"]).len()
        vpart = (g["v"].hash(seed=59).to_numpy() % np.uint64(partitions)).astype(
            np.int32
        )
        return pa.table(
            {
                "k": g["k"].to_arrow(),
                "v": g["v"].to_arrow(),
                "n": g["len"].cast(pl.Int64).to_arrow(),
                "vpart": pa.array(vpart),
            }
        )

    def _reduce(group) -> pa.Table:
        counts = group.groupby(["k", "v"], sort=False)["n"].sum().reset_index()
        keys_out, blobs_out, rows_out = [], [], []
        for key, sub in counts.groupby("k", sort=False):
            sk = sketch_factory()
            sk.update(sub["v"].to_numpy(), sub["n"].to_numpy())
            keys_out.append(str(key))
            blobs_out.append(zlib.compress(sk.to_bytes(), 1))
            rows_out.append(int(sub["n"].sum()))
        return pa.table(
            {
                "key": pa.array(keys_out, pa.string()),
                "blob": pa.array(blobs_out, pa.large_binary()),
                "rows": pa.array(rows_out, pa.int64()),
            }
        )

    return (
        ds.map_batches(_precount, batch_format="pyarrow")
        .groupby("vpart")
        .map_groups(_reduce, batch_format="pandas")
    )


def finalize_sketches(merged_ds, sketch_cls) -> dict[str, Any]:
    """Driver-side final merge of a (small) sketch-row Dataset into
    {key: sketch}; per-key duplicates (combiner partials) are merged."""
    out: dict[str, Any] = {}
    rows = merged_ds.take_all()
    # canonical order: take_all returns blocks in completion order
    rows.sort(key=lambda r: (r["key"], r["blob"]))
    for row in rows:
        sk = sketch_cls.from_bytes(zlib.decompress(row["blob"]))
        k = row["key"]
        out[k] = out[k].merge(sk) if k in out else sk
    return out


def sketch_estimate_table(
    ds,
    sketch_factory: Callable[[], Any],
    value_col: str,
    key_col: str,
    readouts: dict[str, Callable[[Any], Any]],
    *,
    salt: int = 0,
    batch_size: int | None = None,
):
    """HIGH-CARDINALITY per-key sketch table: one ``(key, rows, <readout
    cols>)`` row per group key, as a streaming Dataset — the distributed
    counterpart of :func:`finalize_sketches` for when the KEY SPACE itself
    is big (per-domain / per-shard / per-token-bucket sketches over millions
    of keys at 10^12-sequence scale).

    The driver never sees a sketch: partials merge through the exactly-one-
    row-per-key ``groupby`` topology (``salt > 0`` adds the two-level salted
    reduce for keys whose partial fan-in is itself large), and each readout
    callable (e.g. ``lambda sk: sk.estimate()``) is applied blob-by-blob
    INSIDE ``map_batches`` on the merged rows — only ~one compact row per
    key per block of driver-free output, ready for ``write_parquet`` or a
    downstream join. Consume with ``to_pandas()`` only when the key space is
    known-small.

    Determinism: inherits ``sketch_by_key(merge="groupby")``'s contract —
    exactly-mergeable sketches (HLL/CMS/Bloom/theta/MG/histogram/Gram) give
    bit-identical tables under every salt/topology; KLL/t-digest readouts
    are within the published error bound once multi-level reduces engage."""
    merged = sketch_by_key(
        ds, sketch_factory, value_col, key_col,
        merge="groupby", salt=salt, batch_size=batch_size,
    )
    sketch_cls = type(sketch_factory())
    names = list(readouts)

    def _readout(batch: pa.Table) -> pa.Table:
        sks = [
            sketch_cls.from_bytes(zlib.decompress(b))
            for b in batch["blob"].to_pylist()
        ]
        cols: dict[str, Any] = {
            "key": batch["key"],
            "rows": batch["rows"],
        }
        for name in names:
            fn = readouts[name]
            cols[name] = pa.array([fn(sk) for sk in sks])
        return pa.table(cols)

    return merged.map_batches(_readout, batch_format="pyarrow")
