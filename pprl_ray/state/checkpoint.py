"""Per-partition checkpointing + lineage for sketch builds.

A *partition* is one input parquet fragment (file path + optional row-group
span) — a deterministic function of the input layout, never of scheduling
order. Each partition is built by an idempotent Ray task that emits its
per-key sketch partials; the driver persists them as
``{ckpt_dir}/parts/{partition_id}.parquet`` and then (write-last, atomic
rename) a manifest ``{ckpt_dir}/manifests/{partition_id}.json`` recording
lineage (input path, row count, value count, blob sha256) and throughput
metrics. A resumed run skips every partition with a valid manifest and
re-merges persisted partials — final sketches are byte-identical to an
uninterrupted run (merge associativity + idempotent partials).

This is the batch-pipeline meaning of "resumable from checkpoint with
per-partition lineage + metrics" (north_rule); the same layout works per key
range for sinks.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["CheckpointedSketchBuild", "CheckpointedProfileBuild", "CheckpointedMapWrite"]


def _partition_id(path: str) -> str:
    return hashlib.sha1(path.encode()).hexdigest()[:16]


class CheckpointedSketchBuild:
    """Build {key -> sketch} over a list of parquet files with per-file
    checkpoints.

    ``transform_batch``: optional pa.Table -> pa.Table preprocessing applied
    inside the partition task (e.g. documents -> tokenized corpus).
    """

    def __init__(
        self,
        ckpt_dir: str,
        sketch_factory,
        value_col: str,
        key_col: str | None = None,
        transform_batch=None,
        batch_size: int = 65536,
    ):
        self.ckpt_dir = ckpt_dir
        self.sketch_factory = sketch_factory
        self.value_col = value_col
        self.key_col = key_col
        self.transform_batch = transform_batch
        self.batch_size = batch_size
        os.makedirs(os.path.join(ckpt_dir, "parts"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "manifests"), exist_ok=True)

    # -- manifest helpers ----------------------------------------------------

    def _manifest_path(self, pid: str) -> str:
        return os.path.join(self.ckpt_dir, "manifests", f"{pid}.json")

    def _part_path(self, pid: str) -> str:
        return os.path.join(self.ckpt_dir, "parts", f"{pid}.parquet")

    def _manifest_valid(self, pid: str, input_path: str) -> bool:
        mpath = self._manifest_path(pid)
        ppath = self._part_path(pid)
        if not (os.path.exists(mpath) and os.path.exists(ppath)):
            return False
        try:
            manifest = json.load(open(mpath))
            if manifest["input_path"] != input_path:
                return False
            tbl = pq.read_table(ppath)
            digest = hashlib.sha256(b"".join(tbl["blob"].to_pylist())).hexdigest()
            return digest == manifest["blob_sha256"]
        except Exception:
            return False

    # -- build ---------------------------------------------------------------

    def completed_partitions(self, input_paths: list[str]) -> list[str]:
        return [p for p in input_paths if self._manifest_valid(_partition_id(p), p)]

    def run(self, input_paths: list[str], max_partitions: int | None = None) -> dict:
        """Build (or resume) and return {key: sketch}. ``max_partitions``
        limits how many *pending* partitions are built this call (used to
        test resume); raises if partitions remain pending."""
        import ray

        pending = [p for p in input_paths if not self._manifest_valid(_partition_id(p), p)]
        if max_partitions is not None:
            pending = pending[:max_partitions]

        build = ray.remote(_build_partition)
        futures = {
            path: build.remote(
                path,
                self.sketch_factory,
                self.value_col,
                self.key_col,
                self.transform_batch,
                self.batch_size,
            )
            for path in pending
        }
        for path, fut in futures.items():
            rows, n_values, blobs, wall = ray.get(fut)
            self._persist(path, rows, n_values, blobs, wall)

        done = self.completed_partitions(input_paths)
        if len(done) < len(input_paths):
            raise RuntimeError(
                f"{len(input_paths) - len(done)} partitions still pending; rerun to resume"
            )
        return self._merge(input_paths)

    def _persist(self, path: str, rows: int, n_values: int, blobs: dict, wall: float) -> None:
        pid = _partition_id(path)
        tbl = pa.table(
            {
                "key": pa.array(list(blobs.keys()), pa.string()),
                "blob": pa.array(list(blobs.values()), pa.large_binary()),
            }
        )
        tmp = self._part_path(pid) + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, self._part_path(pid))
        manifest = {
            "partition_id": pid,
            "input_path": path,
            "rows": rows,
            "values": n_values,
            "n_keys": len(blobs),
            "blob_sha256": hashlib.sha256(b"".join(tbl["blob"].to_pylist())).hexdigest(),
            "wall_sec": round(wall, 4),
            "values_per_sec": round(n_values / wall, 1) if wall > 0 else None,
            "completed_at": time.time(),
        }
        mtmp = self._manifest_path(pid) + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, self._manifest_path(pid))  # manifest LAST

    def _merge(self, input_paths: list[str]) -> dict:
        sketch_cls = type(self.sketch_factory())
        merged: dict = {}
        for path in input_paths:  # deterministic order
            tbl = pq.read_table(self._part_path(_partition_id(path)))
            for key, blob in zip(tbl["key"].to_pylist(), tbl["blob"].to_pylist()):
                sk = sketch_cls.from_bytes(zlib.decompress(blob))
                if key in merged:
                    merged[key] = merged[key].merge(sk)
                else:
                    merged[key] = sk
        return merged


class CheckpointedProfileBuild(CheckpointedSketchBuild):
    """Checkpointed FUSED multi-sketch profile: every spec of the one-pass
    corpus profile (``pipelines/profile.py``) accumulated per input
    partition, persisted as (sketch, key, blob) partials with the same
    manifest-last lineage layout, resumed byte-identically."""

    def __init__(self, ckpt_dir: str, specs=None, transform_batch=None, batch_size: int = 8192):
        from ..pipelines.profile import default_specs

        self.specs = specs if specs is not None else default_specs()
        super().__init__(
            ckpt_dir,
            sketch_factory=None,
            value_col=None,
            key_col=None,
            transform_batch=transform_batch,
            batch_size=batch_size,
        )

    def run(self, input_paths: list[str], max_partitions: int | None = None) -> dict:
        """Build (or resume); returns {(sketch_name, key): sketch}."""
        import ray

        pending = [p for p in input_paths if not self._manifest_valid(_partition_id(p), p)]
        if max_partitions is not None:
            pending = pending[:max_partitions]

        build = ray.remote(_build_profile_partition)
        futures = {
            path: build.remote(path, self.specs, self.transform_batch, self.batch_size)
            for path in pending
        }
        for path, fut in futures.items():
            rows, n_values, blobs, wall = ray.get(fut)
            self._persist(path, rows, n_values, blobs, wall)

        done = self.completed_partitions(input_paths)
        if len(done) < len(input_paths):
            raise RuntimeError(
                f"{len(input_paths) - len(done)} partitions still pending; rerun to resume"
            )
        return self._merge(input_paths)

    def _merge(self, input_paths: list[str]) -> dict:
        from ..pipelines.profile import SKETCH_CLASSES

        kind_by_name = {s.name: s.kind for s in self.specs}
        merged: dict = {}
        for path in input_paths:  # deterministic order
            tbl = pq.read_table(self._part_path(_partition_id(path)))
            for key, blob in zip(tbl["key"].to_pylist(), tbl["blob"].to_pylist()):
                name, _, k = key.partition("\x00")
                cls = SKETCH_CLASSES[kind_by_name[name]]
                sk = cls.from_bytes(zlib.decompress(blob))
                gk = (name, k)
                merged[gk] = merged[gk].merge(sk) if gk in merged else sk
        return merged


class CheckpointedMapWrite:
    """Resumable partitioned SINK: one output parquet per input fragment.

    Each input file is processed by an idempotent Ray task (read -> batch
    transform -> write ``{output_dir}/part-{partition_id}.parquet`` via
    atomic rename), then a manifest records lineage (input path, row counts,
    output sha256) and throughput — manifest written LAST, so a crash never
    leaves a valid-looking partial. A resumed run skips every partition with
    a valid manifest; output is never one giant file."""

    def __init__(self, ckpt_dir: str, transform_batch, batch_size: int = 8192):
        self.ckpt_dir = ckpt_dir
        self.transform_batch = transform_batch
        self.batch_size = batch_size
        os.makedirs(os.path.join(ckpt_dir, "manifests"), exist_ok=True)

    def _manifest_path(self, pid: str) -> str:
        return os.path.join(self.ckpt_dir, "manifests", f"{pid}.json")

    def _out_path(self, output_dir: str, pid: str) -> str:
        return os.path.join(output_dir, f"part-{pid}.parquet")

    def _manifest_valid(self, pid: str, input_path: str, output_dir: str) -> bool:
        mpath = self._manifest_path(pid)
        opath = self._out_path(output_dir, pid)
        if not (os.path.exists(mpath) and os.path.exists(opath)):
            return False
        try:
            manifest = json.load(open(mpath))
            if manifest["input_path"] != input_path:
                return False
            with open(opath, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()
            return digest == manifest["output_sha256"]
        except Exception:
            return False

    def completed_partitions(self, input_paths: list[str], output_dir: str) -> list[str]:
        return [
            p for p in input_paths if self._manifest_valid(_partition_id(p), p, output_dir)
        ]

    def run(self, input_paths: list[str], output_dir: str,
            max_partitions: int | None = None) -> dict:
        import ray

        os.makedirs(output_dir, exist_ok=True)
        pending = [
            p for p in input_paths if not self._manifest_valid(_partition_id(p), p, output_dir)
        ]
        skipped = len(input_paths) - len(pending)
        if max_partitions is not None:
            pending = pending[:max_partitions]

        task = ray.remote(_map_write_partition)
        futures = {
            path: task.remote(
                path,
                self._out_path(output_dir, _partition_id(path)),
                self.transform_batch,
                self.batch_size,
            )
            for path in pending
        }
        total_rows = 0
        for path, fut in futures.items():
            rows_in, rows_out, sha, wall = ray.get(fut)
            total_rows += rows_out
            pid = _partition_id(path)
            manifest = {
                "partition_id": pid,
                "input_path": path,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "output_sha256": sha,
                "wall_sec": round(wall, 4),
                "rows_per_sec": round(rows_in / wall, 1) if wall > 0 else None,
                "completed_at": time.time(),
            }
            mtmp = self._manifest_path(pid) + ".tmp"
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, self._manifest_path(pid))  # manifest LAST

        done = self.completed_partitions(input_paths, output_dir)
        if len(done) < len(input_paths):
            raise RuntimeError(
                f"{len(input_paths) - len(done)} partitions still pending; rerun to resume"
            )
        return {"partitions": len(input_paths), "resumed": skipped, "rows_written": total_rows}


def _map_write_partition(path, out_path, transform_batch, batch_size):
    """Idempotent per-partition transform + atomic write (Ray task)."""
    start = time.time()
    pf = pq.ParquetFile(path)
    out_batches = []
    rows_in = 0
    for rb in pf.iter_batches(batch_size=batch_size):
        batch = pa.Table.from_batches([rb])
        rows_in += batch.num_rows
        out_batches.append(transform_batch(batch))
    out = pa.concat_tables(out_batches)
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    with open(tmp, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    os.replace(tmp, out_path)
    return rows_in, out.num_rows, sha, time.time() - start


def _build_profile_partition(path, specs, transform_batch, batch_size):
    """Idempotent fused-profile partition build (runs as a Ray task)."""
    from ..pipelines.profile import SKETCH_CLASSES, MultiSketchPartials

    kind_by_name = {s.name: s.kind for s in specs}
    start = time.time()
    pf = pq.ParquetFile(path)
    stage = MultiSketchPartials(specs)
    acc: dict = {}
    rows = 0
    n_values = 0
    for rb in pf.iter_batches(batch_size=batch_size):
        batch = pa.Table.from_batches([rb])
        if transform_batch is not None:
            batch = transform_batch(batch)
        rows += batch.num_rows
        out = stage(batch)
        for name, key, blob in zip(
            out["sketch"].to_pylist(), out["key"].to_pylist(), out["blob"].to_pylist()
        ):
            cls = SKETCH_CLASSES[kind_by_name[name]]
            sk = cls.from_bytes(zlib.decompress(blob))
            gk = f"{name}\x00{key}"
            acc[gk] = acc[gk].merge(sk) if gk in acc else sk
        for s in specs:
            if s.value_col in batch.column_names:
                col = batch[s.value_col]
                if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                    n_values += len(col.combine_chunks().values)
                break
    blobs = {k: zlib.compress(v.to_bytes(), 1) for k, v in acc.items()}
    return rows, n_values, blobs, time.time() - start


def _build_partition(path, sketch_factory, value_col, key_col, transform_batch, batch_size):
    """Idempotent per-partition build (runs as a Ray task)."""
    from ..state.aggregate import SketchPartials

    start = time.time()
    pf = pq.ParquetFile(path)
    acc: dict = {}
    rows = 0
    n_values = 0
    stage = SketchPartials(sketch_factory, value_col, key_col)
    sketch_cls = type(sketch_factory())
    for rb in pf.iter_batches(batch_size=batch_size):
        batch = pa.Table.from_batches([rb])
        if transform_batch is not None:
            batch = transform_batch(batch)
        rows += batch.num_rows
        out = stage(batch)
        for key, blob in zip(out["key"].to_pylist(), out["blob"].to_pylist()):
            sk = sketch_cls.from_bytes(zlib.decompress(blob))
            if key in acc:
                acc[key] = acc[key].merge(sk)
            else:
                acc[key] = sk
        col = batch[value_col]
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            n_values += len(col.combine_chunks().values)
        else:
            n_values += len(col)
    blobs = {k: zlib.compress(v.to_bytes(), 1) for k, v in acc.items()}
    return rows, n_values, blobs, time.time() - start
