"""Multimodal (image / audio / video) column plumbing.

Media ride as opaque ``large_binary`` payload columns with typed metadata
(``media_type``, ``width``/``height``/``sample_rate``/``duration_ms``). The
Ray-side plumbing — schema, actor-pool stage signatures, batch sizing for
large binary rows, output layout — is real and tested; the actual codec work
is STUBBED (the image/audio libraries are not available in this container):

- ``backend="fake"`` (default): a deterministic decode that derives pixel /
  sample statistics from the payload bytes — stable outputs for tests.
- ``backend="pil"`` / ``backend="soundfile"``: raise ``NotImplementedError``
  with a clear message unless the library import succeeds (the intended
  production path — swap-in, no pipeline change).

Scale note: binary rows are large; stages default to small ``batch_size``
(256) and ``batch_format="pyarrow"`` so payloads stay zero-copy in the
object store rather than being copied into pandas objects.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["ImageDecodeStage", "AudioFeatureStage", "FrameSampleStage", "synth_media_batch"]


def synth_media_batch(batch: pa.Table, payload_bytes: int = 4096, media_type: str = "image/png") -> pa.Table:
    """Attach a deterministic fake binary payload to an (id) batch — the
    test/bench stand-in for real media files."""
    ids = batch["id"].to_numpy()
    payloads = []
    for i in ids:
        seed = hashlib.sha256(f"media-{int(i)}".encode()).digest()
        reps = payload_bytes // len(seed) + 1
        payloads.append((seed * reps)[:payload_bytes])
    return pa.table(
        {
            "media_id": pa.array([f"m-{int(i):010d}" for i in ids], pa.string()),
            "media_type": pa.array([media_type] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(np.full(len(ids), 64, np.int32), pa.int32()),
            "height": pa.array(np.full(len(ids), 64, np.int32), pa.int32()),
        }
    )


def _require(backend: str, lib: str):
    raise NotImplementedError(
        f"backend `{backend}` needs `{lib}`, which is not installed in this "
        f"environment; use backend='fake' (deterministic stub) or install {lib}"
    )


class ImageDecodeStage:
    """Decode + resize + feature-extract an image payload column.

    Output columns: ``img_mean``, ``img_std``, ``img_entropy8`` (byte-level
    proxies under the fake backend), plus a ``thumb`` fixed-size binary
    (resized representation)."""

    def __init__(self, backend: str = "fake", thumb_size: int = 8, payload_col: str = "payload"):
        self.payload_col = payload_col
        self.thumb_size = thumb_size
        if backend == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError:
                _require("pil", "Pillow")
        elif backend != "fake":
            raise ValueError(f"unknown backend `{backend}`")
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        means = np.empty(len(payloads), np.float64)
        stds = np.empty(len(payloads), np.float64)
        ents = np.empty(len(payloads), np.float64)
        thumbs = []
        t = self.thumb_size
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p, dtype=np.uint8)
            means[i] = arr.mean() if len(arr) else 0.0
            stds[i] = arr.std() if len(arr) else 0.0
            counts = np.bincount(arr, minlength=256) / max(len(arr), 1)
            nz = counts[counts > 0]
            ents[i] = float(-(nz * np.log2(nz)).sum())
            # "resize": stride-sample the byte stream to a t*t grid
            idx = np.linspace(0, max(len(arr) - 1, 0), t * t).astype(np.int64)
            thumbs.append(arr[idx].tobytes() if len(arr) else b"\x00" * (t * t))
        out = {name: batch[name] for name in batch.column_names if name != self.payload_col}
        out["img_mean"] = pa.array(means, pa.float64())
        out["img_std"] = pa.array(stds, pa.float64())
        out["img_entropy8"] = pa.array(ents, pa.float64())
        out["thumb"] = pa.array(thumbs, pa.large_binary())
        return pa.table(out)


class AudioFeatureStage:
    """Audio payload -> frame-energy features (fake backend treats the byte
    stream as int8 PCM)."""

    def __init__(self, backend: str = "fake", frame: int = 256, payload_col: str = "payload"):
        self.payload_col = payload_col
        self.frame = frame
        if backend == "soundfile":
            try:
                import soundfile  # noqa: F401
            except ImportError:
                _require("soundfile", "soundfile")
        elif backend != "fake":
            raise ValueError(f"unknown backend `{backend}`")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        rms = np.empty(len(payloads), np.float64)
        zcr = np.empty(len(payloads), np.float64)
        for i, p in enumerate(payloads):
            pcm = np.frombuffer(p, dtype=np.int8).astype(np.float64)
            rms[i] = float(np.sqrt((pcm**2).mean())) if len(pcm) else 0.0
            zcr[i] = float((np.diff(np.signbit(pcm)) != 0).mean()) if len(pcm) > 1 else 0.0
        out = {name: batch[name] for name in batch.column_names if name != self.payload_col}
        out["rms"] = pa.array(rms, pa.float64())
        out["zero_crossing_rate"] = pa.array(zcr, pa.float64())
        return pa.table(out)


class FrameSampleStage:
    """Video payload -> every-Nth-frame sample rows (flat_map shape: one
    input row explodes into ``n_frames`` output rows)."""

    def __init__(self, backend: str = "fake", frame_bytes: int = 256, every: int = 4,
                 payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.frame_bytes = frame_bytes
        self.every = every
        if backend != "fake":
            _require(backend, "a video codec library")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx_out, frames_out = [], [], []
        ids = batch[self.id_col].to_pylist()
        for rid, p in zip(ids, batch[self.payload_col].to_pylist()):
            n_frames = len(p) // self.frame_bytes
            for f in range(0, n_frames, self.every):
                ids_out.append(rid)
                frame_idx_out.append(f)
                frames_out.append(p[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                self.id_col: pa.array(ids_out, pa.string()),
                "frame_idx": pa.array(frame_idx_out, pa.int32()),
                "frame": pa.array(frames_out, pa.large_binary()),
            }
        )
