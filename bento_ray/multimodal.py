"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (this container has no
PIL/ffmpeg/torchaudio): each stage tries the real library in
``__init__`` and, when absent, falls back to a clearly-marked
deterministic fake so the Ray-side plumbing — schema, byte-capped batch
sizing, actor signature, output layout — is real and testable. Swap
``_decode_*_fake`` for the library call on a full image.

Scale notes: binary payloads are wide — size batches by BYTES not rows
(``batch_size`` here is deliberately small; at 1 MB payloads,
batch_size=64 ≈ 64 MB per batch) and keep stages in
``batch_format="pyarrow"`` (binary columns don't survive pandas
round-trips unscathed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from bento_ray.util import default_concurrency as _dc


def _conc(c):
    return c if c is not None else _dc()

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),            # image | audio | video
    pa.field("mime", pa.string()),
    pa.field("payload", pa.binary()),
    pa.field("meta_width", pa.int32()),
    pa.field("meta_height", pa.int32()),
    pa.field("meta_duration_ms", pa.int32()),
])


def _fake_pixels(payload: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic fake decode: pseudo-pixels from a payload digest —
    stands in for PIL.Image.open(...) so downstream feature code runs."""
    d = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.Generator(np.random.Philox(int.from_bytes(d[:8], "big")))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class ImageDecoder:
    """Actor stage: payload → (width, height, mean_luma, phash64).

    Real path: ``PIL.Image.open``; loaded once per actor in __init__.
    Fallback: deterministic fake decode (marked in the ``decoder``
    column so downstream consumers can tell)."""

    def __init__(self, thumb: int = 8):
        self.thumb = thumb
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((self.thumb, self.thumb))
            return np.asarray(img)
        return _fake_pixels(payload, self.thumb, self.thumb)

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, lumas, phashes = [], [], [], []
        for payload in t.column("payload").to_pylist():
            px = self._decode(payload or b"")
            h, w, _ = px.shape
            widths.append(w)
            heights.append(h)
            # ITU-R 601 luma
            luma = (0.299 * px[..., 0] + 0.587 * px[..., 1]
                    + 0.114 * px[..., 2])
            lumas.append(float(luma.mean()))
            # 64-bit average-hash over the 8x8 luma grid
            g = luma[:8, :8]
            bits = (g > g.mean()).flatten()[:64]
            phashes.append(int(np.packbits(bits).astype(np.uint64)
                               .dot(256 ** np.arange(bits.size // 8,
                                                     dtype=np.uint64)[::-1])))
        t = t.append_column("width", pa.array(widths, pa.int32()))
        t = t.append_column("height", pa.array(heights, pa.int32()))
        t = t.append_column("mean_luma", pa.array(np.round(lumas, 4)))
        t = t.append_column("phash64", pa.array(
            np.array(phashes, np.uint64).astype(np.int64), pa.int64()))
        return t.append_column(
            "decoder", pa.array(
                ["pil" if self._pil else "fake"] * len(t), pa.string()))


class AudioFeatures:
    """Actor stage: audio payload → (n_samples, rms, zero_crossings).
    Real path would use soundfile/torchaudio; fallback derives a
    deterministic fake waveform from the payload bytes."""

    def __init__(self, sample_rate: int = 16000):
        self.sr = sample_rate
        try:
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._sf is not None:
            import io

            data, _ = self._sf.read(io.BytesIO(payload))
            return np.asarray(data, np.float32)
        raw = np.frombuffer(
            hashlib.blake2b(payload, digest_size=64).digest(), np.uint8)
        return (raw.astype(np.float32) - 127.5) / 127.5

    def __call__(self, t: pa.Table) -> pa.Table:
        n, rms, zc = [], [], []
        for payload in t.column("payload").to_pylist():
            w = self._decode(payload or b"")
            n.append(len(w))
            rms.append(float(np.sqrt(np.mean(w ** 2))) if len(w) else 0.0)
            zc.append(int((np.diff(np.sign(w)) != 0).sum()) if len(w) else 0)
        t = t.append_column("n_samples", pa.array(n, pa.int64()))
        t = t.append_column("rms", pa.array(np.round(rms, 6)))
        return t.append_column("zero_crossings", pa.array(zc, pa.int64()))


class FrameSampler:
    """Video stage: sample K evenly-spaced 'frames' (offsets into the
    payload; a real build decodes via ffmpeg). Emits one row per frame
    (1→N), each with a frame fingerprint — the layout a downstream
    image-embedding stage consumes."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, fps = [], [], []
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            payload = payload or b""
            for j in range(self.k):
                lo = (len(payload) * j) // self.k
                hi = (len(payload) * (j + 1)) // self.k
                d = hashlib.blake2b(payload[lo:hi], digest_size=8).digest()
                ids.append(mid)
                fidx.append(j)
                fps.append(int.from_bytes(d, "big") >> 1)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_fp": pa.array(fps, pa.int64()),
        })


def decode_images(ds, concurrency: int | None = None, batch_size: int = 64):
    """Byte-capped batches: payloads are wide, so batch small."""
    return ds.map_batches(ImageDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=_conc(concurrency))


def audio_features(ds, concurrency: int | None = None, batch_size: int = 64):
    return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=_conc(concurrency))


def sample_frames(ds, k: int = 4, concurrency: int | None = None, batch_size: int = 32):
    return ds.map_batches(FrameSampler, fn_constructor_args=(k,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=_conc(concurrency))


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests."""
    import random

    rows = {k: [] for k in ("media_id", "kind", "mime", "payload",
                            "meta_width", "meta_height", "meta_duration_ms")}
    kinds = [("image", "image/jpeg"), ("audio", "audio/wav"),
             ("video", "video/mp4")]
    for i in range(n):
        rng = random.Random((seed << 16) ^ i)
        kind, mime = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["mime"].append(mime)
        rows["payload"].append(rng.randbytes(rng.randint(200, 2000)))
        rows["meta_width"].append(640 if kind != "audio" else 0)
        rows["meta_height"].append(480 if kind != "audio" else 0)
        rows["meta_duration_ms"].append(0 if kind == "image" else 5000)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
