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

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "CheckpointedSketchBuild",
    "CheckpointedProfileBuild",
    "CheckpointedMapWrite",
    "CheckpointedMinhashDedup",
    "CheckpointedBlockedMatch",
    "CheckpointedKMeans",
    "CCRoundCheckpoint",
]


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


# --- checkpointed pair pipelines (dedup / blocked match) --------------------


class _BandedPairCheckpoint:
    """Shared machinery for resumable LSH-banded PAIR pipelines
    (minhash near-dup, blocked bit-vector match).

    Two checkpointed stages, both idempotent Ray tasks with the same
    manifest-LAST atomic layout as the sketch builds above:

    - stage A, per input parquet fragment: the per-row signature table
      (payload blob + one band-key column per band), persisted as
      ``{ckpt_dir}/sigs/part-{pid}.parquet``. Deterministic per file.
    - stage B, per band: bucket rows sharing that band's key, emit
      candidate pairs (capped at ``max_bucket`` per bucket, documented
      truncation), verify each candidate EXACTLY from the persisted
      payloads, persist ``{ckpt_dir}/pairs/band-{b}.parquet``. Bands are
      independent, so a killed run resumes at band granularity; a pair
      found by several bands verifies to the same score and collapses in
      the final merge.

    The final merge reads only the (tiny) verified pair files. Outputs are
    sorted, so an interrupted+resumed run is byte-identical to an
    uninterrupted one (tested). Stage-B tasks read per-band key columns
    first and then fetch payloads ONLY for candidate ids via parquet
    filters — at scale, keep sig files sorted by id so row-group pruning
    makes the fetch sublinear."""

    def __init__(self, ckpt_dir: str, bands: int):
        self.ckpt_dir = ckpt_dir
        self.bands = bands
        for sub in ("sigs", "pairs", "manifests"):
            os.makedirs(os.path.join(ckpt_dir, sub), exist_ok=True)

    # -- manifest/paths ------------------------------------------------------

    def _mpath(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, "manifests", f"{name}.json")

    def _sig_path(self, pid: str) -> str:
        return os.path.join(self.ckpt_dir, "sigs", f"part-{pid}.parquet")

    def _band_path(self, b: int) -> str:
        return os.path.join(self.ckpt_dir, "pairs", f"band-{b:03d}.parquet")

    @staticmethod
    def _sha(path: str) -> str:
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    def _write_manifest(self, name: str, payload: dict) -> None:
        tmp = self._mpath(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._mpath(name))  # manifest LAST

    def _valid(self, name: str, out_path: str, lineage: dict) -> bool:
        mpath = self._mpath(name)
        if not (os.path.exists(mpath) and os.path.exists(out_path)):
            return False
        try:
            m = json.load(open(mpath))
            return all(m.get(k) == v for k, v in lineage.items()) and (
                m["output_sha256"] == self._sha(out_path)
            )
        except Exception:
            return False

    # -- driver --------------------------------------------------------------

    def run(self, input_paths, max_stage_a: int | None = None,
            max_bands: int | None = None):
        """Build or resume; returns the merged verified-pair pa.Table.
        ``max_stage_a`` / ``max_bands`` bound how much PENDING work this
        call does (kill/resume testing); raises while work remains."""
        import ray

        pend_a = [
            p for p in input_paths
            if not self._valid(
                f"sig-{_partition_id(p)}", self._sig_path(_partition_id(p)),
                {"input_path": p},
            )
        ]
        if max_stage_a is not None:
            pend_a = pend_a[:max_stage_a]
        task_a = ray.remote(type(self)._stage_a)
        futs = {p: task_a.remote(self, p, self._sig_path(_partition_id(p)) + ".tmp")
                for p in pend_a}
        for p, fut in futs.items():
            rows, wall = ray.get(fut)
            pid = _partition_id(p)
            os.replace(self._sig_path(pid) + ".tmp", self._sig_path(pid))
            self._write_manifest(
                f"sig-{pid}",
                {"input_path": p, "rows": rows, "wall_sec": round(wall, 4),
                 "rows_per_sec": round(rows / wall, 1) if wall > 0 else None,
                 "output_sha256": self._sha(self._sig_path(pid)),
                 "completed_at": time.time()},
            )
        done_a = [
            p for p in input_paths
            if self._valid(f"sig-{_partition_id(p)}",
                           self._sig_path(_partition_id(p)), {"input_path": p})
        ]
        if len(done_a) < len(input_paths):
            raise RuntimeError(
                f"{len(input_paths) - len(done_a)} signature partitions still "
                "pending; rerun to resume"
            )

        sig_paths = sorted(self._sig_path(_partition_id(p)) for p in input_paths)
        sig_lineage = {"sig_files": [os.path.basename(s) for s in sig_paths]}
        pend_b = [
            b for b in range(self.bands)
            if not self._valid(f"band-{b:03d}", self._band_path(b), sig_lineage)
        ]
        if max_bands is not None:
            pend_b = pend_b[:max_bands]
        task_b = ray.remote(type(self)._stage_b)
        futs_b = {b: task_b.remote(self, b, sig_paths, self._band_path(b) + ".tmp")
                  for b in pend_b}
        for b, fut in futs_b.items():
            n_pairs, wall = ray.get(fut)
            os.replace(self._band_path(b) + ".tmp", self._band_path(b))
            self._write_manifest(
                f"band-{b:03d}",
                {**sig_lineage, "band": b, "n_pairs": n_pairs,
                 "wall_sec": round(wall, 4),
                 "output_sha256": self._sha(self._band_path(b)),
                 "completed_at": time.time()},
            )
        done_b = [
            b for b in range(self.bands)
            if self._valid(f"band-{b:03d}", self._band_path(b), sig_lineage)
        ]
        if len(done_b) < self.bands:
            raise RuntimeError(
                f"{self.bands - len(done_b)} band partitions still pending; "
                "rerun to resume"
            )
        return self._merge()

    def _merge(self) -> pa.Table:
        tables = [pq.read_table(self._band_path(b)) for b in range(self.bands)]
        df = pa.concat_tables(tables).to_pandas()
        id_cols = list(df.columns[:2])
        df = (
            df.drop_duplicates(subset=id_cols)
            .sort_values(list(df.columns))
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(df, preserve_index=False)


class CheckpointedMinhashDedup(_BandedPairCheckpoint):
    """Resumable MinHash+LSH near-dup over parquet document fragments:
    per-file (shingles, band-key) signature checkpoints, per-band verified
    pair checkpoints, exact-Jaccard verification from the persisted shingle
    blobs. Semantics match ``stages/dedup.py`` minhash_dedup_pairs (same
    shingle/signature/band kernels, same ``max_bucket`` truncation)."""

    def __init__(self, ckpt_dir: str, threshold: float = 0.8, k: int = 128,
                 bands: int = 16, shingle_n: int = 3, max_bucket: int = 200,
                 id_col: str = "doc_id", text_col: str = "text",
                 batch_size: int = 8192):
        super().__init__(ckpt_dir, bands)
        self.threshold = threshold
        self.k = k
        self.shingle_n = shingle_n
        self.max_bucket = max_bucket
        self.id_col = id_col
        self.text_col = text_col
        self.batch_size = batch_size

    def _stage_a(self, path: str, out_tmp: str):
        from ..sketches.lsh import band_keys, minhash_signatures
        from ..stages.dedup import shingle_tokens

        start = time.time()
        pf = pq.ParquetFile(path)
        parts = []
        for rb in pf.iter_batches(batch_size=self.batch_size,
                                  columns=[self.id_col, self.text_col]):
            batch = pa.Table.from_batches([rb])
            sh = shingle_tokens(batch, self.text_col, self.shingle_n)
            sigs = minhash_signatures(sh, self.k)
            bks = band_keys(sigs, self.bands)  # (rows, bands)
            cols = {
                "id": batch[self.id_col],
                "shingles": pa.array([s.tobytes() for s in sh], pa.large_binary()),
            }
            for b in range(self.bands):
                cols[f"bk{b}"] = pa.array(bks[:, b].astype(np.int64), pa.int64())
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        pq.write_table(out, out_tmp)
        return out.num_rows, time.time() - start

    def _stage_b(self, b: int, sig_paths, out_tmp: str):
        import pandas as pd

        start = time.time()
        key_tbl = pa.concat_tables(
            [pq.read_table(p, columns=["id", f"bk{b}"]) for p in sig_paths]
        )
        df = key_tbl.to_pandas().rename(columns={f"bk{b}": "bk"})
        df = df.sort_values(["bk", "id"]).reset_index(drop=True)
        df = df[df.groupby("bk").cumcount() < self.max_bucket]
        m = df.merge(df, on="bk", suffixes=("_a", "_b"))
        m = m[m["id_a"] < m["id_b"]][["id_a", "id_b"]].drop_duplicates()
        if len(m) == 0:
            out = pa.table({"id_a": pa.array([], key_tbl["id"].type),
                            "id_b": pa.array([], key_tbl["id"].type),
                            "jaccard": pa.array([], pa.float64())})
            pq.write_table(out, out_tmp)
            return 0, time.time() - start
        need = sorted(set(m["id_a"]).union(m["id_b"]))
        blobs = {}
        for p in sig_paths:  # candidate ids only: parquet-filtered fetch
            t = pq.read_table(p, columns=["id", "shingles"],
                              filters=[("id", "in", need)])
            blobs.update(zip(t["id"].to_pylist(), t["shingles"].to_pylist()))
        sims = np.empty(len(m), np.float64)
        for i, (a, c) in enumerate(zip(m["id_a"], m["id_b"])):
            sa = np.frombuffer(blobs[a], dtype=np.uint64)
            sb = np.frombuffer(blobs[c], dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            sims[i] = inter / union if union else 1.0
        out_df = m.assign(jaccard=sims)
        out_df = out_df[out_df["jaccard"] >= self.threshold].sort_values(
            ["id_a", "id_b"]
        )
        pq.write_table(pa.Table.from_pandas(out_df, preserve_index=False), out_tmp)
        return len(out_df), time.time() - start


class CheckpointedBlockedMatch(_BandedPairCheckpoint):
    """Resumable banded bit-vector matching over parquet (id, value[b64])
    fragments of BOTH sides: per-file band-key signature checkpoints,
    per-band exact-similarity-verified pair checkpoints. Semantics match
    ``stages/match.py`` match_blocked (same byte-band splitmix keys, same
    per-bucket-per-side ``max_bucket`` cap)."""

    def __init__(self, ckpt_dir: str, measure: str = "dice", threshold: float = 0.8,
                 bands: int = 16, max_bucket: int = 10_000, batch_size: int = 8192):
        super().__init__(ckpt_dir, bands)
        self.measure = measure
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.batch_size = batch_size

    def run(self, domain_paths, range_paths, **kw):
        """Input fragments of both sides; side is recorded per signature
        file so band tasks can pair domain x range."""
        overlap = set(domain_paths) & set(range_paths)
        if overlap:
            raise ValueError(
                f"domain and range share input files {sorted(overlap)[:3]}; "
                "for self-matching, write the side to two distinct paths "
                "(partition ids are derived from the path)"
            )
        self._side_of = {p: 0 for p in domain_paths}
        self._side_of.update({p: 1 for p in range_paths})
        return super().run(list(domain_paths) + list(range_paths), **kw)

    def _stage_a(self, path: str, out_tmp: str):
        from ..sketches.hashing import splitmix64
        from ..stages.mask import decode_b64_column

        side = self._side_of[path]
        start = time.time()
        pf = pq.ParquetFile(path)
        parts = []
        for rb in pf.iter_batches(batch_size=self.batch_size, columns=["id", "value"]):
            batch = pa.Table.from_batches([rb])
            ids = [str(v) for v in batch["id"].to_pylist()]
            mat = decode_b64_column(batch["value"].to_pylist())
            n, nbytes = mat.shape
            bands_eff = min(self.bands, max(nbytes, 1))
            bounds = np.linspace(0, nbytes, bands_eff + 1).astype(int)
            cols = {
                "id": pa.array(ids, pa.string()),
                "value": batch["value"],
                "side": pa.array(np.full(n, side, np.int8)),
            }
            for b in range(self.bands):
                eb = b % bands_eff  # same band layout as match_blocked
                sl = mat[:, bounds[eb] : bounds[eb + 1]].astype(np.uint64)
                h = np.full(n, np.uint64(eb + 1))
                with np.errstate(over="ignore"):
                    for c in range(sl.shape[1]):
                        h = splitmix64(h ^ sl[:, c])
                cols[f"bk{b}"] = pa.array(h.astype(np.int64), pa.int64())
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        pq.write_table(out, out_tmp)
        return out.num_rows, time.time() - start

    def _stage_b(self, b: int, sig_paths, out_tmp: str):
        from ..functions.similarity import pairwise_similarity
        from ..stages.mask import decode_b64_column

        start = time.time()
        key_tbl = pa.concat_tables(
            [pq.read_table(p, columns=["id", "side", f"bk{b}"]) for p in sig_paths]
        )
        df = key_tbl.to_pandas().rename(columns={f"bk{b}": "bk"})
        df = df.sort_values(["bk", "side", "id"]).reset_index(drop=True)
        df = df[df.groupby(["bk", "side"]).cumcount() < self.max_bucket]
        dom = df[df["side"] == 0][["id", "bk"]]
        rng = df[df["side"] == 1][["id", "bk"]]
        m = dom.merge(rng, on="bk", suffixes=("_d", "_r"))[["id_d", "id_r"]]
        m = m.drop_duplicates()
        empty = pa.table({"domain_id": pa.array([], pa.string()),
                          "range_id": pa.array([], pa.string()),
                          "similarity": pa.array([], pa.float64())})
        if len(m) == 0:
            pq.write_table(empty, out_tmp)
            return 0, time.time() - start
        need = sorted(set(m["id_d"]).union(m["id_r"]))
        vals = {}
        for p in sig_paths:
            t = pq.read_table(p, columns=["id", "side", "value"],
                              filters=[("id", "in", need)])
            for i, s, v in zip(t["id"].to_pylist(), t["side"].to_pylist(),
                               t["value"].to_pylist()):
                vals[(s, i)] = v
        dmat = decode_b64_column([vals[(0, i)] for i in m["id_d"]])
        rmat = decode_b64_column([vals[(1, i)] for i in m["id_r"]])
        sims = pairwise_similarity(dmat, rmat, self.measure)
        keep = sims >= self.threshold
        out_df = m[keep].assign(similarity=sims[keep]).rename(
            columns={"id_d": "domain_id", "id_r": "range_id"}
        ).sort_values(["domain_id", "range_id"])
        pq.write_table(pa.Table.from_pandas(out_df, preserve_index=False), out_tmp)
        return len(out_df), time.time() - start


class CheckpointedKMeans:
    """Resumable iterative k-means: after every Lloyd iteration the
    centroid matrix is persisted (write-last atomic rename) with lineage
    (input dir, k, seed, iteration, centroid sha256) and the iteration's
    wall time. A resumed run loads the last valid iteration and continues
    from there — the final centroids are byte-identical to an
    uninterrupted run because each iteration is a deterministic function
    of (input, previous centroids) (same argument as the sketch builds;
    regression-tested). This extends per-partition checkpointing to the
    ITERATIVE-operator case the north rule's lineage requirement implies.
    """

    def __init__(self, ckpt_dir: str, k: int = 8, vec_col: str = "embedding",
                 id_col: str = "vec_id", iters: int = 10, seed: int = 0):
        self.ckpt_dir = ckpt_dir
        self.k, self.vec_col, self.id_col = k, vec_col, id_col
        self.iters, self.seed = iters, seed
        os.makedirs(os.path.join(ckpt_dir, "iters"), exist_ok=True)

    def _iter_path(self, i: int) -> str:
        return os.path.join(self.ckpt_dir, "iters", f"iter-{i:04d}.npy")

    def _manifest_path(self, i: int) -> str:
        return os.path.join(self.ckpt_dir, "iters", f"iter-{i:04d}.json")

    def _lineage(self, input_tag: str) -> dict:
        return {"input": input_tag, "k": self.k, "seed": self.seed,
                "vec_col": self.vec_col}

    def _valid(self, i: int, input_tag: str) -> bool:
        mp = self._manifest_path(i)
        if not (os.path.exists(mp) and os.path.exists(self._iter_path(i))):
            return False
        with open(mp) as f:
            m = json.load(f)
        if any(m.get(kk) != vv for kk, vv in self._lineage(input_tag).items()):
            return False
        with open(self._iter_path(i), "rb") as f:
            return hashlib.sha256(f.read()).hexdigest() == m.get("sha256")

    def _save(self, i: int, cents: np.ndarray, input_tag: str, wall: float) -> None:
        path = self._iter_path(i)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.save(f, cents)
        os.replace(tmp, path)
        with open(path, "rb") as f:
            sha = hashlib.sha256(f.read()).hexdigest()
        mtmp = self._manifest_path(i) + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({**self._lineage(input_tag), "iteration": i, "sha256": sha,
                       "wall_sec": round(wall, 4)}, f)
        os.replace(mtmp, self._manifest_path(i))

    def fit(self, ds, input_tag: str = "") -> np.ndarray:
        """Run/resume to ``iters`` completed iterations; returns centroids.
        ``ds`` must re-derive identically across runs (e.g. a fresh
        read_parquet of the same files); ``input_tag`` labels the lineage
        (pass the input path)."""
        from ..stages.cluster import _bottomk_rows

        # find last valid completed iteration (0 = init)
        last = -1
        for i in range(self.iters, -1, -1):
            if self._valid(i, input_tag):
                last = i
                break
        if last == -1:
            t0 = time.perf_counter()
            cents = _bottomk_rows(ds, self.id_col, self.vec_col, self.k, self.seed)
            self._save(0, cents, input_tag, time.perf_counter() - t0)
            last = 0
        with open(self._iter_path(last), "rb") as f:
            cents = np.load(f)
        from ..stages.cluster import lloyd_step

        for i in range(last + 1, self.iters + 1):
            t0 = time.perf_counter()
            cents = lloyd_step(ds, cents, self.vec_col)
            self._save(i, cents, input_tag, time.perf_counter() - t0)
        return cents


class CCRoundCheckpoint:
    """Per-round label-table persistence for the DISTRIBUTED
    connected-components path (``connected_components_collapse``): after
    every min-label round the (node, rep) table is written as parquet under
    ``{ckpt_dir}/rounds/round-XXXX/`` with a write-last atomically-renamed
    manifest recording lineage (pair-table fingerprint, partitions), the
    round's changed-count and row count. A killed collapse resumes from the
    last valid round instead of round 0 — final labels identical to an
    uninterrupted run because each round is a deterministic function of
    (static edge table, previous labels), both re-derived from the same
    pair table (kill/resume regression-tested). Extends the kmeans-style
    iterative checkpointing to the pair-graph operator the near-dup
    pipeline ends with; the LOCAL (single-task union-find) path finishes in
    one task and never checkpoints.
    """

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = ckpt_dir
        os.makedirs(os.path.join(ckpt_dir, "rounds"), exist_ok=True)

    def _round_dir(self, i: int) -> str:
        return os.path.join(self.ckpt_dir, "rounds", f"round-{i:04d}")

    def _manifest_path(self, i: int) -> str:
        return os.path.join(self.ckpt_dir, "rounds", f"round-{i:04d}.json")

    def _valid(self, i: int, lineage: dict) -> dict | None:
        """The stored manifest when round ``i`` is valid, else None."""
        mp, rd = self._manifest_path(i), self._round_dir(i)
        if not (os.path.exists(mp) and os.path.isdir(rd)):
            return None
        with open(mp) as f:
            m = json.load(f)
        if any(m.get(k) != v for k, v in lineage.items()):
            return None
        try:  # metadata-only row count — no data read
            import pyarrow.dataset as pads

            rows = pads.dataset(rd, format="parquet").count_rows()
        except Exception:
            return None
        return m if rows == m.get("rows") else None

    def last_valid_round(self, lineage: dict, max_rounds: int) -> dict | None:
        """Manifest of the highest valid persisted round (None if none)."""
        for i in range(max_rounds, -1, -1):
            m = self._valid(i, lineage)
            if m is not None:
                return m
        return None

    def load_round(self, i: int):
        import ray.data as rd

        return rd.read_parquet(self._round_dir(i)).materialize()

    def save_round(self, i: int, labels_ds, lineage: dict, changed: int,
                   wall: float) -> None:
        """Persist a MATERIALIZED label dataset as this round's table."""
        final = self._round_dir(i)
        tmp = final + f".tmp-{os.getpid()}"
        labels_ds.map_batches(
            lambda b: b.select(["node", "rep"]), batch_format="pyarrow"
        ).write_parquet(tmp)
        if os.path.isdir(final):  # stale partial from a killed run
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        mtmp = self._manifest_path(i) + f".tmp-{os.getpid()}"
        with open(mtmp, "w") as f:
            json.dump({**lineage, "round": i, "changed": int(changed),
                       "rows": labels_ds.count(),
                       "wall_sec": round(wall, 4)}, f)
        os.replace(mtmp, self._manifest_path(i))


def _index_build_partition(input_path: str, out_dir: str, pid: str,
                           text_col: str, id_col: str, partitions: int,
                           batch_size: int) -> dict:
    """Idempotent per-fragment index-build task: read one parquet fragment,
    emit distinct (token, id) postings per md5 token bucket, write ONE file
    per non-empty bucket as ``bucket=<b>/<pid>.parquet`` via atomic rename.
    Returns the manifest payload (written by the caller, manifest-last)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.digest import md5_bucket32

    t0 = time.perf_counter()
    pf = pq.ParquetFile(input_path)
    acc: dict[int, list] = {}
    n_rows = 0
    for batch in pf.iter_batches(batch_size=batch_size, columns=[id_col, text_col]):
        import polars as pl

        tbl = pa.Table.from_batches([batch])
        n_rows += tbl.num_rows
        posts = (
            pl.from_arrow(tbl)
            .with_columns(pl.col(text_col).str.split(" ").alias("token"))
            .explode("token")
            .filter(pl.col("token").str.len_chars() > 0)
            .select([pl.col("token"), pl.col(id_col)])
            .unique()
            .to_arrow()
        )
        bucket = md5_bucket32(posts["token"], partitions)
        for b in np.unique(bucket):
            acc.setdefault(int(b), []).append(posts.filter(pa.array(bucket == b)))
    shas = {}
    for b, tables in sorted(acc.items()):
        merged = pa.concat_tables(tables)
        import polars as pl

        dedup = (
            pl.from_arrow(merged).unique().sort(["token", id_col]).to_arrow()
        )
        bdir = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        path = os.path.join(bdir, f"{pid}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(dedup.cast(pa.schema([("token", pa.string()),
                                             (id_col, dedup[id_col].type)])), tmp)
        os.replace(tmp, path)
        with open(path, "rb") as f:
            shas[str(b)] = hashlib.sha256(f.read()).hexdigest()
    return {
        "input_path": input_path,
        "rows": n_rows,
        "buckets": shas,
        "wall_sec": round(time.perf_counter() - t0, 4),
    }


class CheckpointedIndexBuild:
    """Resumable inverted-token-index build (stages/textindex.py layout):
    one idempotent Ray task per input fragment writes its postings into the
    md5-bucket-partitioned directory tree as ``bucket=<b>/<pid>.parquet``
    (atomic renames, all files before the manifest), then a per-fragment
    manifest records lineage (input path, row count, per-bucket sha256,
    wall seconds) LAST — a crash never leaves a valid-looking partial, and
    a resumed run skips every fragment with a valid manifest. The finished
    tree serves ``lookup_postings`` partition-pruned reads unchanged."""

    def __init__(self, ckpt_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", partitions: int = 32,
                 batch_size: int = 65536, index_dir: str | None = None):
        self.ckpt_dir = ckpt_dir
        self.text_col, self.id_col = text_col, id_col
        self.partitions = partitions
        self.batch_size = batch_size
        # output tree defaults to <ckpt>/index but is overridable so CLI
        # callers' --index-dir is honored rather than silently ignored
        self.index_dir = index_dir or os.path.join(ckpt_dir, "index")
        os.makedirs(os.path.join(ckpt_dir, "manifests"), exist_ok=True)
        os.makedirs(self.index_dir, exist_ok=True)

    def _manifest_path(self, pid: str) -> str:
        return os.path.join(self.ckpt_dir, "manifests", f"{pid}.json")

    def _manifest_valid(self, pid: str, input_path: str) -> bool:
        mp = self._manifest_path(pid)
        if not os.path.exists(mp):
            return False
        try:
            m = json.load(open(mp))
            if m["input_path"] != input_path or m.get("partitions") != self.partitions:
                return False
            for b, sha in m["buckets"].items():
                path = os.path.join(self.index_dir, f"bucket={b}", f"{pid}.parquet")
                with open(path, "rb") as f:
                    if hashlib.sha256(f.read()).hexdigest() != sha:
                        return False
            return True
        except Exception:
            return False

    def completed_partitions(self, input_paths: list[str]) -> list[str]:
        return [p for p in input_paths if self._manifest_valid(_partition_id(p), p)]

    def run(self, input_paths: list[str], max_partitions: int | None = None) -> dict:
        import ray

        pending = [
            p for p in input_paths if not self._manifest_valid(_partition_id(p), p)
        ]
        skipped = len(input_paths) - len(pending)
        if max_partitions is not None:
            pending = pending[:max_partitions]
        task = ray.remote(_index_build_partition)
        futures = {
            p: task.remote(p, self.index_dir, _partition_id(p), self.text_col,
                           self.id_col, self.partitions, self.batch_size)
            for p in pending
        }
        for p, fut in futures.items():
            payload = ray.get(fut)
            payload["partitions"] = self.partitions
            mp = self._manifest_path(_partition_id(p))
            tmp = mp + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, mp)
        return {"built": len(pending), "skipped": skipped,
                "index_dir": self.index_dir}
