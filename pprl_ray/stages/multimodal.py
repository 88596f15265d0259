"""Multimodal (image / audio / video) column plumbing + pure-numpy codecs.

Media ride as opaque ``large_binary`` payload columns with typed metadata
(``media_type``, ``width``/``height``/``sample_rate``/``duration_ms``).
Backends per stage:

- ``backend="bmp"`` (images) / ``backend="wav"`` (audio) / ``backend="y4m"``
  (video): REAL decoders for the uncompressed containers, implemented in
  pure numpy from the public format specs (BMP: 24-bpp bottom-up BGR with
  4-byte row padding; WAV: RIFF chunks, 16-bit mono PCM; Y4M: YUV4MPEG2
  Cmono frame stream) — decode -> feature-extract / frame-sample is a
  genuine codec pipeline with no extra dependencies.
- ``backend="fake"`` (default): a deterministic stand-in that derives
  statistics straight from the payload bytes — stable outputs for tests.
- ``backend="pil"`` / ``backend="soundfile"``: raise ``NotImplementedError``
  with a clear message unless the library import succeeds (the compressed-
  format production path — swap-in, no pipeline change).

Scale note: binary rows are large; stages default to small ``batch_size``
(256) and ``batch_format="pyarrow"`` so payloads stay zero-copy in the
object store rather than being copied into pandas objects.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = [
    "ImageDecodeStage",
    "AudioFeatureStage",
    "FrameSampleStage",
    "synth_media_batch",
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
    "encode_y4m",
    "decode_y4m",
]


# --- pure-numpy codecs ------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bpp uncompressed BMP bytes (bottom-up BGR
    rows, 4-byte-aligned), per the public BITMAPINFOHEADER layout."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (off,) = struct.unpack_from("<I", data, 10)
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bpp uncompressed BMP supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, np.uint8, count=row_size * h, offset=off).reshape(h, row_size)
    img = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono PCM samples -> RIFF/WAVE bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 mono sample array, sample_rate). Walks the
    chunk list (fmt may not be adjacent to data in arbitrary writers)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", data, pos + 8)
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only mono 16-bit PCM WAV supported")
        elif cid == b"data":
            samples = np.frombuffer(data, "<i2", count=size // 2, offset=pos + 8)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    return samples, rate


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(N, H, W) uint8 grayscale frames -> YUV4MPEG2 (Y4M) bytes with the
    ``Cmono`` colorspace (Y plane only), per the public yuv4mpeg spec:
    a space-separated parameter header line, then ``FRAME\\n`` + raw plane
    bytes per frame."""
    n, h, w = frames.shape
    assert frames.dtype == np.uint8
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    return head + b"".join(b"FRAME\n" + frames[i].tobytes() for i in range(n))


def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 (Cmono) bytes -> ((N, H, W) uint8 frames, fps)."""
    nl = data.index(b"\n")
    head = data[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fps = None
    for tok in head[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = int(num) // int(den)
        elif tok[:1] == b"C" and tok != b"Cmono":
            raise ValueError(f"only Cmono Y4M supported (got {tok.decode()})")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    plane = w * h
    frames = []
    pos = nl + 1
    while pos < len(data):
        fe = data.index(b"\n", pos)  # FRAME line (may carry parameters)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        frames.append(np.frombuffer(data, np.uint8, count=plane, offset=fe + 1).reshape(h, w))
        pos = fe + 1 + plane
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps or 0


def synth_media_batch(batch: pa.Table, payload_bytes: int = 4096, media_type: str = "image/png") -> pa.Table:
    """Attach a deterministic binary payload to an (id) batch — the
    test/bench stand-in for real media files.

    ``media_type="image/bmp"`` / ``"audio/wav"`` emit REAL containers
    (deterministic 16x16 RGB images / 1024-sample PCM tones derived from
    the id via sha256) so the bmp/wav decode backends exercise a genuine
    decode; other media types keep the raw sha256-stream payload."""
    ids = batch["id"].to_numpy()
    payloads = []
    w = h = 16
    for i in ids:
        seed = hashlib.sha256(f"media-{int(i)}".encode()).digest()
        if media_type == "image/bmp":
            reps = (w * h * 3) // len(seed) + 1
            px = np.frombuffer((seed * reps)[: w * h * 3], np.uint8).reshape(h, w, 3)
            payloads.append(encode_bmp(px))
        elif media_type == "video/y4m":
            nf = 8
            reps = (nf * w * h) // len(seed) + 1
            base = np.frombuffer((seed * reps)[: nf * w * h], np.uint8).reshape(nf, h, w)
            # per-frame brightness ramp so sampled frames are distinguishable
            ramp = (np.arange(nf, dtype=np.uint16) * 7)[:, None, None]
            payloads.append(encode_y4m(((base + ramp) % 256).astype(np.uint8)))
        elif media_type == "audio/wav":
            n = 1024
            f0 = 100 + (seed[0] % 32) * 25  # per-id tone frequency
            t = np.arange(n, dtype=np.float64) / 8000.0
            noise = (
                np.frombuffer((seed * (n // len(seed) + 1))[:n], np.uint8).astype(np.float64)
                - 127.5
            )
            pcm = (8000 * np.sin(2 * np.pi * f0 * t) + 16 * noise).astype(np.int16)
            payloads.append(encode_wav(pcm))
        else:
            reps = payload_bytes // len(seed) + 1
            payloads.append((seed * reps)[:payload_bytes])
    return pa.table(
        {
            "media_id": pa.array([f"m-{int(i):010d}" for i in ids], pa.string()),
            "media_type": pa.array([media_type] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(np.full(len(ids), w if media_type == "image/bmp" else 64, np.int32), pa.int32()),
            "height": pa.array(np.full(len(ids), h if media_type == "image/bmp" else 64, np.int32), pa.int32()),
        }
    )


def _require(backend: str, lib: str, codec: str = "fake"):
    raise NotImplementedError(
        f"backend `{backend}` needs `{lib}`, which is not installed in this "
        f"environment; use the dependency-free backend='{codec}' numpy codec "
        f"(real container parsing) or backend='fake' (deterministic stub), "
        f"or install {lib}"
    )


class ImageDecodeStage:
    """Decode + resize + feature-extract an image payload column.

    Output columns: ``img_mean``, ``img_std``, ``img_entropy8``, plus a
    ``thumb`` fixed-size binary (t*t grayscale). ``backend="bmp"`` runs the
    real :func:`decode_bmp` and computes the features over actual pixels
    (grayscale = integer channel mean), with a nearest-neighbor t*t
    resize; ``"fake"`` derives the same statistics from the raw payload
    bytes (deterministic stand-in for tests)."""

    def __init__(self, backend: str = "fake", thumb_size: int = 8, payload_col: str = "payload"):
        self.payload_col = payload_col
        self.thumb_size = thumb_size
        if backend == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError:
                _require("pil", "Pillow", codec="bmp")
        elif backend not in ("fake", "bmp"):
            raise ValueError(f"unknown backend `{backend}`")
        self.backend = backend

    def _gray(self, payload: bytes) -> np.ndarray:
        """Decoded 2-D grayscale uint8 array for the configured backend."""
        if self.backend == "bmp":
            img = decode_bmp(payload)
            return (img.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        # fake: the raw byte stream as a 1-row "image"
        return np.frombuffer(payload, dtype=np.uint8).reshape(1, -1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        means = np.empty(len(payloads), np.float64)
        stds = np.empty(len(payloads), np.float64)
        ents = np.empty(len(payloads), np.float64)
        thumbs = []
        t = self.thumb_size
        for i, p in enumerate(payloads):
            g = self._gray(p) if len(p) else np.zeros((1, 1), np.uint8)
            flat = g.ravel()
            means[i] = flat.mean() if len(p) else 0.0
            stds[i] = flat.std() if len(p) else 0.0
            counts = np.bincount(flat, minlength=256) / max(flat.size, 1)
            nz = counts[counts > 0]
            ents[i] = float(-(nz * np.log2(nz)).sum())
            # nearest-neighbor resize to a t*t grayscale thumb
            yy = np.linspace(0, g.shape[0] - 1, t).astype(np.int64)
            xx = np.linspace(0, g.shape[1] - 1, t).astype(np.int64)
            thumbs.append(g[np.ix_(yy, xx)].tobytes() if len(p) else b"\x00" * (t * t))
        out = {name: batch[name] for name in batch.column_names if name != self.payload_col}
        out["img_mean"] = pa.array(means, pa.float64())
        out["img_std"] = pa.array(stds, pa.float64())
        out["img_entropy8"] = pa.array(ents, pa.float64())
        out["thumb"] = pa.array(thumbs, pa.large_binary())
        return pa.table(out)


class AudioFeatureStage:
    """Audio payload -> frame-energy features. ``backend="wav"`` runs the
    real :func:`decode_wav` (RIFF chunks, 16-bit mono PCM) and adds the
    decoded ``sample_rate`` / ``duration_ms`` metadata; ``"fake"`` treats
    the byte stream as int8 PCM (deterministic stand-in)."""

    def __init__(self, backend: str = "fake", frame: int = 256, payload_col: str = "payload"):
        self.payload_col = payload_col
        self.frame = frame
        if backend == "soundfile":
            try:
                import soundfile  # noqa: F401
            except ImportError:
                _require("soundfile", "soundfile", codec="wav")
        elif backend not in ("fake", "wav"):
            raise ValueError(f"unknown backend `{backend}`")
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        rms = np.empty(len(payloads), np.float64)
        zcr = np.empty(len(payloads), np.float64)
        rates = np.zeros(len(payloads), np.int32)
        dur = np.zeros(len(payloads), np.float64)
        for i, p in enumerate(payloads):
            if self.backend == "wav":
                samples, rate = decode_wav(p)
                pcm = samples.astype(np.float64)
                rates[i] = rate
                dur[i] = 1000.0 * len(samples) / rate
            else:
                pcm = np.frombuffer(p, dtype=np.int8).astype(np.float64)
            rms[i] = float(np.sqrt((pcm**2).mean())) if len(pcm) else 0.0
            zcr[i] = float((np.diff(np.signbit(pcm)) != 0).mean()) if len(pcm) > 1 else 0.0
        out = {name: batch[name] for name in batch.column_names if name != self.payload_col}
        out["rms"] = pa.array(rms, pa.float64())
        out["zero_crossing_rate"] = pa.array(zcr, pa.float64())
        if self.backend == "wav":
            out["sample_rate"] = pa.array(rates, pa.int32())
            out["duration_ms"] = pa.array(dur, pa.float64())
        return pa.table(out)


class FrameSampleStage:
    """Video payload -> every-Nth-frame sample rows (flat_map shape: one
    input row explodes into ``n_frames / every`` output rows, each carrying
    the raw frame bytes and its mean luminance).

    ``backend="y4m"`` runs the real :func:`decode_y4m` (YUV4MPEG2 Cmono)
    and samples decoded Y planes; ``"fake"`` slices the raw payload into
    fixed-size pseudo-frames (deterministic stand-in); ``"av"`` is the
    compressed-container production path and raises until the library is
    installed."""

    def __init__(self, backend: str = "fake", frame_bytes: int = 256, every: int = 4,
                 payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.frame_bytes = frame_bytes
        self.every = every
        if backend == "av":
            try:
                import av  # noqa: F401
            except ImportError:
                _require("av", "PyAV", codec="y4m")
        elif backend not in ("fake", "y4m"):
            _require(backend, "a video codec library", codec="y4m")
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx_out, frames_out, means_out = [], [], [], []
        ids = batch[self.id_col].to_pylist()
        for rid, p in zip(ids, batch[self.payload_col].to_pylist()):
            if self.backend == "y4m":
                frames, _ = decode_y4m(p)
                for f in range(0, len(frames), self.every):
                    ids_out.append(rid)
                    frame_idx_out.append(f)
                    frames_out.append(frames[f].tobytes())
                    means_out.append(float(frames[f].mean()))
            else:
                n_frames = len(p) // self.frame_bytes
                for f in range(0, n_frames, self.every):
                    raw = p[f * self.frame_bytes : (f + 1) * self.frame_bytes]
                    ids_out.append(rid)
                    frame_idx_out.append(f)
                    frames_out.append(raw)
                    means_out.append(float(np.frombuffer(raw, np.uint8).mean()) if raw else 0.0)
        return pa.table(
            {
                self.id_col: pa.array(ids_out, pa.string()),
                "frame_idx": pa.array(frame_idx_out, pa.int32()),
                "frame": pa.array(frames_out, pa.large_binary()),
                "frame_mean": pa.array(means_out, pa.float64()),
            }
        )


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal type-II DCT matrix (the standard pHash transform)."""
    k = np.arange(n, dtype=np.float64)
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    d[0] *= 1.0 / np.sqrt(2.0)
    return d


class PerceptualHashStage:
    """pHash: 64-bit perceptual fingerprint of an image payload column.

    Classic DCT perceptual hash (Zauner 2010, "Implementation and
    Benchmarking of Perceptual Image Hash Functions"): grayscale → 2-D
    orthonormal DCT-II → keep the top-left ``hash_size x hash_size``
    low-frequency block → bit i = coefficient_i > median(block) → pack
    MSB-first into one uint64. Visually-near images land within a small
    Hamming distance, so the OUTPUT column is named ``simhash`` and feeds
    :func:`pprl_ray.stages.dedup.simhash_candidates` unchanged — banded
    near-dup blocking over images reuses the text machinery verbatim.

    ``backend="bmp"`` decodes real 24-bpp BMPs via the pure-numpy codec
    (grayscale = integer channel mean, like ImageDecodeStage); ``"fake"``
    hashes the raw payload bytes as a 1-row image (deterministic test
    stand-in); compressed formats gate on the pil import. DCT matrices
    are cached per shape in the actor (``__init__``-owned dict), so the
    per-image cost is two small matmuls."""

    def __init__(self, backend: str = "fake", hash_size: int = 8,
                 payload_col: str = "payload", id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.hash_size = int(hash_size)
        assert self.hash_size * self.hash_size == 64, "pHash packs 64 bits"
        if backend == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError:
                _require("pil", "Pillow", codec="bmp")
        elif backend not in ("fake", "bmp"):
            raise ValueError(f"unknown backend `{backend}`")
        self.backend = backend
        self._dcts: dict[int, np.ndarray] = {}

    def _gray(self, payload: bytes) -> np.ndarray:
        if self.backend == "bmp":
            img = decode_bmp(payload)
            return (img.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
        return np.frombuffer(payload, dtype=np.uint8).reshape(1, -1)

    def _dct(self, n: int) -> np.ndarray:
        if n not in self._dcts:
            self._dcts[n] = _dct_matrix(n)
        return self._dcts[n]

    def phash64(self, gray: np.ndarray) -> int:
        h, w = gray.shape
        t = self.hash_size
        if h < t or w < t:  # tile tiny/degenerate inputs up to the block
            reps = (t + h - 1) // h, (t + w - 1) // w
            gray = np.tile(gray, reps)
            h, w = gray.shape
        coef = self._dct(h) @ gray.astype(np.float64) @ self._dct(w).T
        block = coef[:t, :t].ravel()
        bits = block > np.median(block)
        return int(np.packbits(bits).view(">u8")[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        hashes = np.empty(len(payloads), dtype=np.uint64)
        for i, p in enumerate(payloads):
            g = self._gray(p) if len(p) else np.zeros((1, 1), np.uint8)
            hashes[i] = np.uint64(self.phash64(g))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(hashes.astype(np.int64), pa.int64()),
            }
        )


def synth_smooth_image(i: int, size: int = 16) -> np.ndarray:
    """Deterministic SMOOTH grayscale test image (sum of three seed-derived
    low-frequency cosines, normalized to uint8). Unlike the sha256 noise
    payloads of synth_media_batch (which are pHash's adversarial worst
    case — coefficients cluster at the median), these behave like real
    photographs under perceptual hashing: small pixel perturbations move
    the hash by a few bits, unrelated images by ~32."""
    seed = hashlib.sha256(f"img-{int(i)}".encode()).digest()
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    img = np.zeros((size, size), np.float64)
    for k in range(3):
        fy, fx = seed[2 * k] % 4, seed[2 * k + 1] % 4
        amp = 1 + seed[6 + k] / 32.0
        phase = seed[10 + k] / 255.0 * 2 * np.pi
        img += amp * np.cos(np.pi * (fy * yy + fx * xx) / size + phase)
    img -= img.min()
    img /= max(img.max(), 1e-9)
    return (img * 255).astype(np.uint8)


class AudioFingerprintStage:
    """Audio near-dup fingerprint: Haitsma–Kalker (2002) band-energy
    delta-sign words, collapsed to one 64-bit SimHash per clip.

    Per clip: Hann-windowed frames (``frame`` samples, ``hop`` stride) →
    rfft power spectrum → ``bands`` log-spaced band energies → per-frame
    word = sign bits of the time–frequency double delta
    ``(E[t,b+1]−E[t,b]) − (E[t−1,b+1]−E[t−1,b])`` (the classic robust
    audio fingerprint), then SimHash64 over the clip's bag of frame words
    so the OUTPUT column (``simhash``) feeds
    :func:`pprl_ray.stages.dedup.simhash_candidates` unchanged — the same
    banded blocking that dedups text and images dedups audio. Perturbed
    copies (noise, small gain changes) keep most frame words, so their
    SimHashes land within a few bits; different recordings are ~32 apart.

    ``backend="wav"`` decodes real RIFF/PCM via the pure-numpy codec;
    ``"fake"`` treats the payload bytes as int8 PCM; compressed formats
    gate on the soundfile import. The Hann window and band edges are
    precomputed per actor (``__init__``). The default ``hop=frame/8``
    (87.5% overlap) follows the paper's heavy-overlap design — adjacent
    frames are highly correlated, so the delta-sign bits are STABLE under
    small perturbations; at hop=frame/2 the near-zero deltas flip freely
    and re-encoded copies drift below any usable Jaccard floor (measured:
    near-dup J >= 0.25 at hop=32 vs >= 0.06 at hop=128 on the same
    fixture)."""

    def __init__(self, backend: str = "fake", frame: int = 256, hop: int = 32,
                 bands: int = 17, payload_col: str = "payload",
                 id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        self.frame = int(frame)
        self.hop = int(hop)
        if backend == "soundfile":
            try:
                import soundfile  # noqa: F401
            except ImportError:
                _require("soundfile", "soundfile", codec="wav")
        elif backend not in ("fake", "wav"):
            raise ValueError(f"unknown backend `{backend}`")
        self.backend = backend
        self.window = np.hanning(self.frame)
        nbins = self.frame // 2 + 1
        # log-spaced band edges over bins [1, nbins): skip DC
        self.edges = np.unique(
            np.round(np.geomspace(1, nbins - 1, int(bands))).astype(np.int64)
        )

    def frame_words(self, pcm: np.ndarray) -> np.ndarray:
        """Per-frame delta-sign words (int64) of one PCM clip."""
        n = (len(pcm) - self.frame) // self.hop + 1
        if n < 2:
            return np.empty(0, dtype=np.int64)
        idx = np.arange(self.frame)[None, :] + self.hop * np.arange(n)[:, None]
        frames = pcm[idx] * self.window[None, :]
        spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        e = np.add.reduceat(spec, self.edges[:-1], axis=1)  # (n, bands-1)
        d = np.diff(e, axis=1)  # band delta
        dd = d[1:] - d[:-1]  # time delta of band delta
        bits = dd > 0
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))[None, :]
        return (bits * weights).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches import simhash64

        payloads = batch[self.payload_col].to_pylist()
        words = []
        n_frames = np.empty(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            if self.backend == "wav":
                samples, _ = decode_wav(p)
                pcm = samples.astype(np.float64)
            else:
                pcm = np.frombuffer(p, dtype=np.int8).astype(np.float64)
            w = self.frame_words(pcm)
            words.append(w)
            n_frames[i] = len(w)
        fps = simhash64(words)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(fps.astype(np.int64), pa.int64()),
                "n_frames": pa.array(n_frames, pa.int64()),
                # the per-frame words themselves (a few hundred int64 per
                # clip) — the Jaccard-matching input for array_jaccard_pairs
                "words": pa.array([w.tolist() for w in words], pa.list_(pa.int64())),
            }
        )


class VideoFingerprintStage:
    """Video near-dup fingerprint: per-frame perceptual hashes as the
    clip's word bag. Decode Y4M (pure-numpy, Cmono) → DCT pHash per frame
    (:class:`PerceptualHashStage` kernel, per-shape DCT matrices cached) →
    the clip is the SET of its frame hashes, matched downstream by
    :func:`pprl_ray.stages.dedup.array_jaccard_pairs` exactly like audio
    frame words. This is EDIT-level dedup: trimmed / extended /
    reordered / frame-dropped copies share their surviving frames' exact
    hashes, so Jaccard IS the shared-frame fraction (a 8-of-12-frame trim
    scores 2/3). Per-pixel re-encodes move each frame's pHash by a few
    bits — exact word matching misses those by design; route the exploded
    (clip, frame-hash) rows through banded simhash_candidates when
    noise-level matching is needed. Also emits one clip-level SimHash
    over the bag and ``n_frames``."""

    def __init__(self, backend: str = "fake", payload_col: str = "payload",
                 id_col: str = "media_id"):
        self.payload_col = payload_col
        self.id_col = id_col
        if backend == "av":
            try:
                import av  # noqa: F401
            except ImportError:
                _require("av", "PyAV", codec="y4m")
        elif backend not in ("fake", "y4m"):
            raise ValueError(f"unknown backend `{backend}`")
        self.backend = backend
        self._phash = PerceptualHashStage(backend="fake")  # kernel reuse only

    def frame_hashes(self, frames: np.ndarray) -> np.ndarray:
        out = np.empty(len(frames), dtype=np.int64)
        for i, f in enumerate(frames):
            out[i] = np.int64(np.uint64(self._phash.phash64(f)).astype(np.int64))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches import simhash64

        payloads = batch[self.payload_col].to_pylist()
        words, n_frames = [], np.empty(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            if self.backend == "y4m":
                frames, _ = decode_y4m(p)
            else:
                side = max(int(len(p) ** 0.5) // 8 * 8, 8)
                usable = (len(p) // (side * side)) * side * side
                frames = (
                    np.frombuffer(p[:usable], np.uint8).reshape(-1, side, side)
                    if usable else np.zeros((1, 8, 8), np.uint8)
                )
            w = self.frame_hashes(frames)
            words.append(w)
            n_frames[i] = len(w)
        fps = simhash64(words)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(fps.astype(np.int64), pa.int64()),
                "n_frames": pa.array(n_frames, pa.int64()),
                "words": pa.array([w.tolist() for w in words], pa.list_(pa.int64())),
            }
        )
