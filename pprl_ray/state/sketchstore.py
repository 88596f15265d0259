"""Persisted per-key sketch store: build / incremental refresh / pruned
lookup.

The sketch-table counterpart of the persisted dedup hash index
(stages/dedup.py) and the IVF index (stages/ann.py): a directory of
``bucket=NN/`` Parquet partitions holding one ``(key, blob, rows)`` row per
group key, where blob is a zlib-compressed mergeable sketch
(sketches/base.py contract). Because sketch merges are associative and
commutative,

    refresh(build(A), B)  ==  build(A ∪ B)   (bit-identical blobs)

— so a store can grow corpus-version by corpus-version without ever
re-reading old data, and the result is indistinguishable from a from-
scratch build (property the ``kmv_store_refresh`` driver query verifies
against a computed SQL oracle over the UNION of both halves).

Layout / scale:

- keys partition by ``crc32(key) % buckets``; refresh only reads the
  buckets that actually receive new keys (partition pruning), and lookup
  reads only the buckets of the requested keys.
- all merging runs through ``merge_blob_rows``'s partition-run reducer —
  the driver never holds a sketch; store size is bounded by key
  cardinality × sketch size, not by data volume.
- a ``_manifest.json`` (written LAST, the checkpoint.py convention) pins
  sketch class/params, bucket count, per-bucket row counts and blob
  sha256s — lineage enough to detect a torn write or a parameter
  mismatch on refresh. Digests are computed by one Ray task per bucket
  over the on-disk partitions (no shuffle — the data is already grouped),
  and a refresh re-digests ONLY the buckets it rewrote, so refresh cost
  is proportional to the touched buckets, never to store size.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib
from typing import Any, Callable

import numpy as np
import pyarrow as pa

__all__ = ["build_sketch_store", "refresh_sketch_store", "lookup_sketch_store"]


def _bucket_of(key: str, buckets: int) -> int:
    return zlib.crc32(key.encode()) % buckets


def _bucket_files(data_dir: str, bucket_ids) -> list[str]:
    """Parquet FILES of the given bucket partitions (read_parquet accepts a
    directory or a file list, but not a list of directories)."""
    files: list[str] = []
    for b in sorted(bucket_ids):
        p = os.path.join(data_dir, f"bucket={b}")
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
    return files


def _add_bucket(batch: pa.Table, buckets: int) -> pa.Table:
    b = np.array(
        [_bucket_of(k, buckets) for k in batch["key"].to_pylist()], dtype=np.int32
    )
    return batch.append_column("bucket", pa.array(b))


def _write_store(merged_ds, store_dir: str, buckets: int, sketch_name: str,
                 sketch_blob_params: bytes) -> dict:
    ds = merged_ds.map_batches(
        lambda t: _add_bucket(t, buckets), batch_format="pyarrow"
    )
    ds.write_parquet(os.path.join(store_dir, "data"), partition_cols=["bucket"])
    return _finalize_manifest(store_dir, buckets, sketch_name, sketch_blob_params)


def _digest_bucket(files: list[str]) -> tuple[int, str]:
    """Rows + canonical-order blob sha256 of ONE bucket partition. Runs as
    a Ray task per bucket: the store is already partitioned by bucket on
    disk, so no shuffle is needed to group it — and only (rows, sha) ever
    leaves the task, never the keys. Memory bound: one bucket's table in
    the task heap — the same per-bucket bound lookup already has, sized by
    the `buckets` choice (key_cardinality x sketch_size / buckets)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pa.concat_tables([pq.read_table(f, columns=["key", "blob"]) for f in files])
    order = pc.sort_indices(t, sort_keys=[("key", "ascending")])
    sha = hashlib.sha256()
    for blob in pc.take(t["blob"], order):
        sha.update(blob.as_py())
    return t.num_rows, sha.hexdigest()


def _params_blob(sketch_factory: Callable[[], Any]) -> tuple[str, bytes]:
    sk = sketch_factory()
    return type(sk).__name__, sk.to_bytes()  # empty-state bytes pin the params


def build_sketch_store(ds, sketch_factory: Callable[[], Any], value_col: str,
                       key_col: str, store_dir: str, buckets: int = 32) -> dict:
    """One streaming pass -> a bucket-partitioned per-key sketch store."""
    from .aggregate import sketch_by_key

    os.makedirs(store_dir, exist_ok=True)
    merged = sketch_by_key(ds, sketch_factory, value_col, key_col, merge="groupby")
    name, params = _params_blob(sketch_factory)
    return _write_store(merged, store_dir, buckets, name, params)


def refresh_sketch_store(ds, sketch_factory: Callable[[], Any], value_col: str,
                         key_col: str, store_dir: str) -> dict:
    """Merge a NEW dataset into an existing store without re-reading old
    input data: sketch the new rows, read back ONLY the store buckets that
    receive new keys (partition pruning), merge blobs per key, rewrite
    those buckets. Associativity makes the result bit-identical to a
    from-scratch build over the union."""
    import ray.data as rd

    from ..sketches.base import SKETCHES  # noqa: F401
    from .aggregate import merge_blob_rows, sketch_by_key

    with open(os.path.join(store_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    name, params = _params_blob(sketch_factory)
    if manifest["sketch"] != name or (
        manifest["params_sha"] != hashlib.sha256(params).hexdigest()
    ):
        raise ValueError(
            f"store {store_dir} holds {manifest['sketch']} sketches with "
            f"different parameters — refresh must use the same factory"
        )
    buckets = int(manifest["buckets"])

    new_rows = (
        sketch_by_key(ds, sketch_factory, value_col, key_col, merge="groupby")
        # normalize to Arrow blocks: the groupby reducer emits pandas
        # blocks, and Dataset.union requires both sides to match the
        # parquet read's Arrow blocks
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )

    # distinct touched buckets, computed in the workers (only <= `buckets`
    # small ints reach the driver — never the key strings themselves)
    def _buckets_of(batch: pa.Table) -> pa.Table:
        bs = {_bucket_of(k, buckets) for k in batch["key"].to_pylist()}
        return pa.table({"bucket": pa.array(sorted(bs), pa.int32())})

    touched = set(
        new_rows.map_batches(_buckets_of, batch_format="pyarrow")
        .unique("bucket")
    )

    data_dir = os.path.join(store_dir, "data")
    sketch_cls = type(sketch_factory())
    parts = _bucket_files(data_dir, touched)
    if parts:
        old = rd.read_parquet(parts, columns=["key", "blob", "rows"])
        combined = merge_blob_rows(old.union(new_rows), sketch_cls)
    else:
        combined = new_rows
    combined = combined.materialize()

    # rewrite only the touched buckets; untouched partitions stay in place
    import shutil

    for b in sorted(touched):
        p = os.path.join(data_dir, f"bucket={b}")
        if os.path.isdir(p):
            shutil.rmtree(p)
    out = combined.map_batches(
        lambda t: _add_bucket(t, buckets), batch_format="pyarrow"
    )
    out.write_parquet(data_dir, partition_cols=["bucket"])
    return _finalize_manifest(
        store_dir, buckets, name, params, touched=touched, prev=manifest
    )


def _finalize_manifest(store_dir: str, buckets: int, name: str,
                       params: bytes, touched=None,
                       prev: dict | None = None) -> dict:
    """Recompute the manifest from what is on disk (manifest-last). Blob
    hashes accumulate in canonical (key) order per bucket, so the manifest
    is a pure function of store CONTENT, independent of block layout. The
    store is already bucket-partitioned on disk, so digests need NO
    shuffle: one Ray task per bucket reads that bucket's files and returns
    (rows, sha) — and with `touched`, refresh recomputes ONLY the buckets
    it rewrote, carrying the rest forward from `prev`, keeping refresh
    cost proportional to touched buckets, not store size."""
    import ray

    data_dir = os.path.join(store_dir, "data")
    if touched is None:
        bucket_ids = sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(data_dir)
            if d.startswith("bucket=")
        )
    else:
        bucket_ids = sorted(touched)

    digest_task = ray.remote(num_cpus=1)(_digest_bucket)
    refs = {
        b: digest_task.remote(files)
        for b in bucket_ids
        if (files := _bucket_files(data_dir, [b]))
    }
    per_bucket = dict(prev["per_bucket"]) if prev else {}
    for b, (rows, sha) in zip(refs, ray.get(list(refs.values()))):
        per_bucket[str(b)] = {"rows": int(rows), "blob_sha256": sha}
    per_bucket = dict(sorted(per_bucket.items()))
    manifest = {
        "sketch": name,
        "params_sha": hashlib.sha256(params).hexdigest(),
        "buckets": buckets,
        "per_bucket": per_bucket,
    }
    with open(os.path.join(store_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def lookup_sketch_store(store_dir: str, keys: list[str],
                        sketch_cls) -> dict[str, Any]:
    """Read ONLY the buckets the requested keys hash to (partition
    pruning), filter to the keys, and return {key: sketch}."""
    import pyarrow.compute as pc
    import ray.data as rd

    with open(os.path.join(store_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    buckets = int(manifest["buckets"])
    want = {str(k) for k in keys}
    need = sorted({_bucket_of(k, buckets) for k in want})
    data_dir = os.path.join(store_dir, "data")
    parts = _bucket_files(data_dir, need)
    out: dict[str, Any] = {}
    if not parts:
        return out
    ds = rd.read_parquet(parts, columns=["key", "blob"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["key"], pa.array(sorted(want)))),
        batch_format="pyarrow",
    )
    for batch in ds.iter_batches(batch_format="pyarrow"):
        for k, blob in zip(batch["key"].to_pylist(), batch["blob"].to_pylist()):
            sk = sketch_cls.from_bytes(zlib.decompress(blob))
            out[k] = out[k].merge(sk) if k in out else sk
    return out
