"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Decode is REAL for the containers a pure-Python + numpy codec can
handle (PNG / BMP / PPM / GIF / baseline AND progressive JPEG images,
animated GIF as the multi-frame "video" path, RIFF/WAVE audio — see
``bento_ray.mediacodec`` and ``bento_ray.jpegcodec``; MP4 container
metadata is parsed for real by ``bento_ray.mp4box``, and MP4 video
samples carrying baseline H.264 decode to real pixels via
``bento_ray.h264codec`` — both I_PCM and PREDICTED I_4x4/I_16x16
macroblocks with CAVLC residuals, the ordinary all-intra shape).
Only payloads whose decode needs a native library this container
lacks (CABAC / inter-predicted H.264, H.265, MP3/AAC audio samples,
dense-residual CAVLC beyond h264cavlc's transcribed coeff_token
tables) fall back to a clearly-marked
deterministic fake so the Ray-side plumbing still runs; the
``decoder`` column records which path produced each row
("pil" / "pure" / "fake").

Scale notes: binary payloads are wide — size batches by BYTES not rows
(``batch_size`` here is deliberately small; at 1 MB payloads,
batch_size=64 ≈ 64 MB per batch) and keep stages in
``batch_format="pyarrow"`` (binary columns don't survive pandas
round-trips unscathed). Decode itself is a per-item kernel by nature
(each payload is one opaque blob), so the per-row loop INSIDE the
batch is correct here — the parallelism axis is payloads × actors.
"""

from __future__ import annotations

import hashlib
from struct import error as struct_error

import numpy as np
import pyarrow as pa

from bento_ray import mediacodec as mc
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
    """Deterministic fake decode for undecodable containers:
    pseudo-pixels from a payload digest so downstream feature code
    still runs and the run is reproducible."""
    d = hashlib.blake2b(payload, digest_size=32).digest()
    rng = np.random.Generator(np.random.Philox(int.from_bytes(d[:8], "big")))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _ahash64(luma: np.ndarray) -> int:
    """64-bit average-hash over an 8x8 luma grid."""
    g = luma[:8, :8]
    bits = (g > g.mean()).flatten()[:64]
    return int(np.packbits(bits).astype(np.uint64)
               .dot(256 ** np.arange(bits.size // 8,
                                     dtype=np.uint64)[::-1]))


def _luma(px: np.ndarray) -> np.ndarray:
    # ITU-R 601
    return (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2])


class ImageDecoder:
    """Actor stage: payload → (width, height, mean_luma, phash64).

    Decode ladder, resolved once per actor in ``__init__``:
    PIL when importable → pure codecs (PNG/BMP/PPM/GIF) → deterministic
    fake. width/height are the REAL container dimensions on the real
    paths; luma/phash are computed on a bilinear thumb."""

    def __init__(self, thumb: int = 8):
        self.thumb = thumb
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes) -> tuple[np.ndarray, int, int, str]:
        """→ (thumb pixels, real width, real height, decoder tag)."""
        if self._pil is not None:
            import io

            try:
                img = self._pil.open(io.BytesIO(payload)).convert("RGB")
                w, h = img.size
                img = img.resize((self.thumb, self.thumb))
                return np.asarray(img), w, h, "pil"
            except Exception:
                pass
        try:
            px = mc.decode_image(payload)
            h, w = px.shape[:2]
            return mc.resize_bilinear(px, (self.thumb, self.thumb)), \
                w, h, "pure"
        except (mc.MediaDecodeError, ValueError, struct_error):
            px = _fake_pixels(payload, self.thumb, self.thumb)
            return px, self.thumb, self.thumb, "fake"

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, lumas, phashes, decoders = [], [], [], [], []
        for payload in t.column("payload").to_pylist():
            px, w, h, dec = self._decode(payload or b"")
            widths.append(w)
            heights.append(h)
            luma = _luma(px)
            lumas.append(float(luma.mean()))
            phashes.append(_ahash64(luma))
            decoders.append(dec)
        t = t.append_column("width", pa.array(widths, pa.int32()))
        t = t.append_column("height", pa.array(heights, pa.int32()))
        t = t.append_column("mean_luma", pa.array(np.round(lumas, 4)))
        t = t.append_column("phash64", pa.array(
            np.array(phashes, np.uint64).astype(np.int64), pa.int64()))
        return t.append_column("decoder", pa.array(decoders, pa.string()))


class ImageResizer:
    """Actor stage: payload → resized payload (re-encoded PNG) +
    updated meta_width/meta_height. Undecodable payloads pass through
    unchanged with decoder='fake' so a mixed corpus never errors."""

    def __init__(self, width: int, height: int, method: str = "bilinear"):
        self.size = (width, height)
        self.resize = (mc.resize_bilinear if method == "bilinear"
                       else mc.resize_nearest)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads, widths, heights, decoders = [], [], [], []
        for payload in t.column("payload").to_pylist():
            payload = payload or b""
            try:
                px = mc.decode_image(payload)
                out = self.resize(px, self.size)
                payloads.append(mc.encode_png(out))
                widths.append(self.size[0])
                heights.append(self.size[1])
                decoders.append("pure")
            except (mc.MediaDecodeError, ValueError, struct_error):
                payloads.append(payload)
                widths.append(0)
                heights.append(0)
                decoders.append("fake")
        cols = {name: t.column(name) for name in t.column_names}
        cols["payload"] = pa.array(payloads, pa.binary())
        cols["meta_width"] = pa.array(widths, pa.int32())
        cols["meta_height"] = pa.array(heights, pa.int32())
        cols["decoder"] = pa.array(decoders, pa.string())
        return pa.table(cols)


class AudioFeatures:
    """Actor stage: audio payload → (n_samples, sample_rate, rms,
    zero_crossings). Decode ladder: soundfile → pure RIFF/WAVE codec →
    deterministic fake waveform. Multi-channel audio is mono-mixed
    before the features."""

    def __init__(self, sample_rate: int = 16000):
        self.sr = sample_rate
        try:
            import soundfile  # noqa: F401

            self._sf = soundfile
        except ImportError:
            self._sf = None

    def _decode(self, payload: bytes) -> tuple[np.ndarray, int, str]:
        if self._sf is not None:
            import io

            try:
                data, rate = self._sf.read(io.BytesIO(payload))
                return np.asarray(data, np.float32), int(rate), "sf"
            except Exception:
                pass
        try:
            x, rate = mc.decode_wav(payload)
            return x, rate, "pure"
        except (mc.MediaDecodeError, ValueError, struct_error):
            raw = np.frombuffer(
                hashlib.blake2b(payload, digest_size=64).digest(), np.uint8)
            return (raw.astype(np.float32) - 127.5) / 127.5, self.sr, "fake"

    def __call__(self, t: pa.Table) -> pa.Table:
        n, rates, rms, zc, decoders = [], [], [], [], []
        for payload in t.column("payload").to_pylist():
            w, rate, dec = self._decode(payload or b"")
            if w.ndim == 2:
                w = w.mean(axis=1)
            n.append(len(w))
            rates.append(rate)
            rms.append(float(np.sqrt(np.mean(w ** 2))) if len(w) else 0.0)
            zc.append(int((np.diff(np.sign(w)) != 0).sum()) if len(w) else 0)
            decoders.append(dec)
        t = t.append_column("n_samples", pa.array(n, pa.int64()))
        t = t.append_column("sample_rate", pa.array(rates, pa.int32()))
        t = t.append_column("rms", pa.array(np.round(rms, 6)))
        t = t.append_column("zero_crossings", pa.array(zc, pa.int64()))
        return t.append_column("decoder", pa.array(decoders, pa.string()))


class FrameSampler:
    """Video stage: sample K evenly-spaced frames, one output row per
    frame (1→N), each with a 64-bit frame fingerprint — the layout a
    downstream image-embedding stage consumes.

    Real paths: animated GIF (full frame decode) and MP4 carrying
    baseline all-intra H.264 — I_PCM or predicted I_4x4/I_16x16 +
    CAVLC samples (h264codec.py / h264intra.py — only the selected K
    samples are decoded, never the whole track; all-IDR layout means
    any sample decodes standalone). Everything else (CABAC or
    inter-predicted H.264, webm, missing avcC) takes the
    deterministic byte-range fallback, recorded in ``decoder``."""

    def __init__(self, k: int = 4):
        self.k = k

    def _sample_real(self, payload: bytes):
        if payload[4:8] == b"ftyp":
            return self._sample_mp4(payload)
        frames = list(mc.decode_gif_frames(payload))
        if not frames:
            raise mc.MediaDecodeError("empty GIF")
        # evenly-spaced selection over the real frame sequence
        pos = np.linspace(0, len(frames) - 1, self.k).round().astype(int)
        return [_ahash64(_luma(mc.resize_bilinear(frames[p], (8, 8))))
                for p in pos]

    def _sample_mp4(self, payload: bytes):
        from bento_ray.h264codec import decode_avc_sample
        from bento_ray.mp4box import Mp4ParseError, extract_video_samples

        try:
            avcc, samples = extract_video_samples(payload)
            if not samples:
                raise mc.MediaDecodeError("empty sample table")
            pos = np.linspace(0, len(samples) - 1, self.k) \
                .round().astype(int)
            return [_ahash64(_luma(mc.resize_bilinear(
                decode_avc_sample(avcc, samples[p]), (8, 8))))
                for p in pos]
        except Mp4ParseError as e:
            raise mc.MediaDecodeError(str(e)) from e

    def _sample_fake(self, payload: bytes):
        fps = []
        for j in range(self.k):
            lo = (len(payload) * j) // self.k
            hi = (len(payload) * (j + 1)) // self.k
            d = hashlib.blake2b(payload[lo:hi], digest_size=8).digest()
            fps.append(int.from_bytes(d, "big") >> 1)
        return fps

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, fps, decoders = [], [], [], []
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            payload = payload or b""
            try:
                fingerprints = self._sample_real(payload)
                dec = "pure"
            except (mc.MediaDecodeError, ValueError, struct_error):
                fingerprints = self._sample_fake(payload)
                dec = "fake"
            for j, fp in enumerate(fingerprints):
                ids.append(mid)
                fidx.append(j)
                fps.append(int(np.uint64(fp).astype(np.int64)))
                decoders.append(dec)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_fp": pa.array(fps, pa.int64()),
            "decoder": pa.array(decoders, pa.string()),
        })


class VideoMetadata:
    """Container-level video metadata: REAL for animated GIF (frames
    decoded, ``decoder='pure'``) and MP4 (ISO-BMFF box tree parsed,
    ``decoder='container'`` — metadata real, frames not decoded); the
    deterministic fake fallback covers everything else."""

    def __init__(self):
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        from bento_ray.mp4box import Mp4ParseError, parse_mp4

        cols = {k: [] for k in ("media_id", "container", "n_frames",
                                "duration_ms", "width", "height",
                                "codec", "fps", "decoder")}
        for mid, payload in zip(t.column("media_id").to_pylist(),
                                t.column("payload").to_pylist()):
            payload = payload or b""
            fmt = mc.sniff_format(payload)
            row = {"media_id": mid, "container": fmt or "unknown",
                   "n_frames": 0, "duration_ms": 0, "width": 0,
                   "height": 0, "codec": "", "fps": 0.0,
                   "decoder": "fake"}
            try:
                if fmt == "gif":
                    frames = list(mc.decode_gif_frames(payload))
                    row.update(n_frames=len(frames),
                               duration_ms=len(frames) * 100,
                               height=frames[0].shape[0],
                               width=frames[0].shape[1],
                               codec="gif", fps=10.0, decoder="pure")
                elif fmt == "mp4":
                    meta = parse_mp4(payload)
                    vid = next((tr for tr in meta["tracks"]
                                if tr["kind"] == "video"), None)
                    if vid is not None:
                        row.update(n_frames=vid["n_samples"],
                                   duration_ms=vid["duration_ms"],
                                   width=vid["width"],
                                   height=vid["height"],
                                   codec=vid["codec"], fps=vid["fps"],
                                   decoder="container")
            except (mc.MediaDecodeError, Mp4ParseError, ValueError,
                    struct_error):
                pass
            for k, v in row.items():
                cols[k].append(v)
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.int64()),
            "container": pa.array(cols["container"], pa.string()),
            "n_frames": pa.array(cols["n_frames"], pa.int64()),
            "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
            "width": pa.array(cols["width"], pa.int64()),
            "height": pa.array(cols["height"], pa.int64()),
            "codec": pa.array(cols["codec"], pa.string()),
            "fps": pa.array(cols["fps"], pa.float64()),
            "decoder": pa.array(cols["decoder"], pa.string()),
        })


def video_metadata(ds, concurrency: int | None = None,
                   batch_size: int = 32):
    return ds.map_batches(VideoMetadata, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=_conc(concurrency))


def decode_images(ds, concurrency: int | None = None, batch_size: int = 64):
    """Byte-capped batches: payloads are wide, so batch small."""
    return ds.map_batches(ImageDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=_conc(concurrency))


def resize_images(ds, width: int, height: int, method: str = "bilinear",
                  concurrency: int | None = None, batch_size: int = 64):
    return ds.map_batches(ImageResizer,
                          fn_constructor_args=(width, height, method),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=_conc(concurrency))


def audio_features(ds, concurrency: int | None = None, batch_size: int = 64):
    return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=_conc(concurrency))


def sample_frames(ds, k: int = 4, concurrency: int | None = None, batch_size: int = 32):
    return ds.map_batches(FrameSampler, fn_constructor_args=(k,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=_conc(concurrency))


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media corpus with REAL encoded payloads: PNG
    gradients+noise for images, 16-bit PCM WAV sines for audio, and
    6-frame animated GIFs (web-safe palette) for video — so tests
    exercise the real decode paths end-to-end. A slice of rows gets
    JPEG-magic payloads to exercise the fake-fallback path too."""
    rows = {k: [] for k in ("media_id", "kind", "mime", "payload",
                            "meta_width", "meta_height", "meta_duration_ms")}
    kinds = [("image", "image/png"), ("audio", "audio/wav"),
             ("video", "image/gif")]
    levels = np.array([0, 51, 102, 153, 204, 255], np.uint8)
    for i in range(n):
        rng = np.random.Generator(np.random.Philox((seed << 16) ^ i))
        kind, mime = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        w = h = dur = 0
        if kind == "image" and i % 9 == 0:
            # undecodable container: JPEG magic + random tail
            # (exercises the fake-fallback path)
            payload = b"\xff\xd8\xff\xe0" + rng.bytes(200)
            mime = "image/jpeg"
        elif kind == "image" and i % 9 == 6:
            # REAL baseline JPEG (4:2:0) through the pure codec
            from bento_ray.jpegcodec import encode_jpeg

            w, h = int(rng.integers(12, 40)), int(rng.integers(12, 40))
            ramp = np.linspace(0, 255, w, dtype=np.float32)
            px = np.clip(ramp[None, :, None]
                         + rng.normal(0, 30, (h, w, 3)), 0, 255) \
                .astype(np.uint8)
            payload = encode_jpeg(px, quality=85, subsample=True)
            mime = "image/jpeg"
        elif kind == "image":
            w, h = int(rng.integers(12, 40)), int(rng.integers(12, 40))
            ramp = np.linspace(0, 255, w, dtype=np.float32)
            px = np.clip(ramp[None, :, None]
                         + rng.normal(0, 40, (h, w, 3)), 0, 255) \
                .astype(np.uint8)
            payload = mc.encode_png(px)
        elif kind == "audio":
            rate = 8000
            dur = int(rng.integers(50, 300))
            t = np.arange(int(rate * dur / 1000), dtype=np.float32) / rate
            freq = float(rng.integers(100, 2000))
            payload = mc.encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)
        elif kind == "video" and i % 12 in (5, 8):
            # MP4 with REAL decodable H.264 (h264codec.py):
            # slot 5 = all-IDR I_PCM baseline (lossless); slot 8 =
            # PREDICTED I_4x4/I_16x16 macroblocks + CAVLC residuals
            # (the ordinary all-intra shape). FrameSampler decodes
            # actual pixels from both (decoder='pure').
            from bento_ray.mp4box import encode_mp4_avc

            w, h, nf = 32, 24, 12
            base = levels[rng.integers(0, 6, (h, w, 3))]
            vid_frames = [np.roll(base, j * 3, axis=1) for j in range(nf)]
            payload = encode_mp4_avc(
                vid_frames, fps=12,
                coding="cavlc" if i % 12 == 8 else "pcm")
            mime = "video/mp4"
            dur = nf * 1000 // 12
        elif kind == "video" and i % 12 == 11:
            # MP4 stub: real ISO-BMFF container structure, dummy
            # sample bytes (exercises the sampler's fake fallback)
            from bento_ray.mp4box import encode_mp4_stub

            w, h, nf = 32, 24, 12
            payload = encode_mp4_stub(width=w, height=h, n_frames=nf,
                                      fps=12, seed=i)
            mime = "video/mp4"
            dur = nf * 1000 // 12
        else:  # video: animated GIF with real frames
            w, h, nf = 16, 12, 6
            base = levels[rng.integers(0, 6, (h, w, 3))]
            frames = [np.roll(base, j * 2, axis=1) for j in range(nf)]
            payload = mc.encode_gif(frames)
            dur = nf * 100
        rows["mime"].append(mime)
        rows["payload"].append(payload)
        rows["meta_width"].append(w)
        rows["meta_height"].append(h)
        rows["meta_duration_ms"].append(dur)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual-hash image dedup (LAION-style corpus curation)
# ---------------------------------------------------------------------------

def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (type-II, norm='ortho')."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def _phash64_dct(luma32: np.ndarray) -> int:
    """True perceptual hash (pHash, imagehash convention): 2-D DCT of
    the 32×32 luma thumb, keep the top-left 8×8 low-frequency block,
    threshold each coefficient against the block median."""
    d = _DCT32 @ luma32 @ _DCT32.T
    block = d[:8, :8]
    bits = (block > np.median(block)).flatten()
    return int(np.packbits(bits).astype(np.uint64)
               .dot(256 ** np.arange(8, dtype=np.uint64)[::-1]))


class ImagePHash(ImageDecoder):
    """Actor stage: payload → 64-bit DCT perceptual hash. The decode
    ladder is ImageDecoder's (PIL → pure codecs → deterministic
    fake), run on a 32×32 bilinear thumb as pHash requires."""

    def __init__(self):
        super().__init__(thumb=32)

    def __call__(self, t: pa.Table) -> pa.Table:
        hashes, decoders = [], []
        for payload in t.column("payload").to_pylist():
            px, _w, _h, dec = self._decode(payload or b"")
            hashes.append(_phash64_dct(_luma(px)))
            decoders.append(dec)
        t = t.append_column("phash", pa.array(
            np.array(hashes, np.uint64).astype(np.int64), pa.int64()))
        return t.append_column("decoder", pa.array(decoders, pa.string()))


def _phash_pair_scan(t: pa.Table, num_pair_parts: int) -> pa.Table:
    """Candidate pairs inside one coarse bucket partition, CARRYING
    both 64-bit hashes with the pair (16 extra bytes/pair — cheaper at
    any scale than the two shuffle joins the text simhash path uses to
    re-attach fingerprints to pairs). Same fully-vectorized
    boundary-scan + cumulative-offset expansion as
    textops.dedup._pair_partition_scan."""
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hash_a": pa.array([], pa.int64()),
                      "hash_b": pa.array([], pa.int64()),
                      "pair_part": pa.array([], pa.int64())})
    n = len(t)
    if n == 0:
        return empty
    idx = pa.compute.sort_indices(t, sort_keys=[
        ("band_id", "ascending"), ("band_hash", "ascending"),
        ("doc_id", "ascending")])
    t = t.take(idx)
    bid = t.column("band_id").to_numpy()
    bh = t.column("band_hash").to_numpy()
    docs = t.column("doc_id").to_numpy()
    hsh = t.column("h").to_numpy()
    bucket_id = np.zeros(n, np.int64)
    bucket_id[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
    bucket_id = np.cumsum(bucket_id)
    dup = np.zeros(n, bool)
    dup[1:] = (docs[1:] == docs[:-1]) & (bucket_id[1:] == bucket_id[:-1])
    if dup.any():
        keep = ~dup
        docs, hsh, bucket_id = docs[keep], hsh[keep], bucket_id[keep]
        n = len(docs)
    sizes = np.bincount(bucket_id)
    group_start = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pos = np.arange(n) - group_start[bucket_id]
    total = int(pos.sum())
    if total == 0:
        return empty
    seg_start = np.concatenate([[0], np.cumsum(pos)[:-1]])
    b_idx = np.repeat(np.arange(n), pos)
    a_idx = (np.arange(total) - np.repeat(seg_start, pos)
             + np.repeat(group_start[bucket_id], pos))
    packed = (docs[a_idx].astype(np.uint64) << np.uint64(32)) \
        | docs[b_idx].astype(np.uint64)
    packed, first = np.unique(packed, return_index=True)
    return pa.table({
        "doc_a": pa.array((packed >> np.uint64(32)).astype(np.int64)),
        "doc_b": pa.array((packed & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        "hash_a": pa.array(hsh[a_idx[first]], pa.int64()),
        "hash_b": pa.array(hsh[b_idx[first]], pa.int64()),
        "pair_part": pa.array(
            (packed % np.uint64(num_pair_parts)).astype(np.int64)),
    })


def image_near_dups(ds, *, max_hamming: int = 3,
                    concurrency: int | None = None,
                    num_parts: int | None = None):
    """Near-duplicate IMAGE pairs by perceptual hash — the multimodal
    counterpart of textops.simhash_near_dups, for image-corpus
    curation (LAION-style pHash dedup): 4×16-bit band LSH over the
    64-bit DCT pHash, exact Hamming verify. EXACT at
    ``max_hamming ≤ 3`` by pigeonhole (4 disjoint bands: ≤3 flipped
    bits leave ≥1 band identical).

    Distributed plan: pHash actor pool (decode once per payload) →
    band explosion (4 rows × 16 bytes per image) → coarse bucket
    partitions, vectorized boundary scans → hash-partitioned pair
    dedup + popcount verify. Pairs CARRY their two hashes, so no
    join is needed to verify — at 10^9 images the moving state is
    bounded by band rows (≈64 B/image) + surviving pairs. media_ids
    must pack in 32 bits (same contract as the text pair helpers).
    Returns (media_a, media_b, hamming), media_a < media_b."""
    from bento_ray.util import stable_hash

    if num_parts is None:
        from bento_ray.util import cluster_cpus
        num_parts = max(4, cluster_cpus())
    P = num_parts

    sigs = ds.map_batches(ImagePHash, batch_size=64,
                          concurrency=_conc(concurrency),
                          batch_format="pyarrow") \
        .map_batches(lambda t: t.select(["media_id", "phash"]),
                     batch_format="pyarrow")

    def _explode(t: pa.Table) -> pa.Table:
        h = t.column("phash").to_numpy().astype(np.uint64)
        ids = t.column("media_id").to_numpy()
        band_id = np.tile(np.arange(4, dtype=np.int64), len(h))
        hh = np.repeat(h, 4)
        band = (hh >> (band_id.astype(np.uint64) * np.uint64(16))) \
            & np.uint64(0xFFFF)
        import pandas as pd

        bucket = (stable_hash(pd.Series(
            band_id * 1_000_003 + band.astype(np.int64)))
            % np.uint64(P)).astype(np.int64)
        return pa.table({
            "band_id": pa.array(band_id),
            "band_hash": pa.array(band, pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "h": pa.array(np.repeat(h, 4).astype(np.int64), pa.int64()),
            "bucket_part": pa.array(bucket),
        })

    def _dedup_verify(t: pa.Table) -> pa.Table:
        from bento_ray.textops.dedup import _popcount64

        empty = pa.table({"media_a": pa.array([], pa.int64()),
                          "media_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        A = t.column("doc_a").to_numpy().astype(np.uint64)
        B = t.column("doc_b").to_numpy().astype(np.uint64)
        packed, first = np.unique((A << np.uint64(32)) | B,
                                  return_index=True)
        ha = t.column("hash_a").to_numpy()[first].astype(np.uint64)
        hb = t.column("hash_b").to_numpy()[first].astype(np.uint64)
        ham = _popcount64(ha ^ hb)
        keep = ham <= max_hamming
        return pa.table({
            "media_a": pa.array(
                (packed >> np.uint64(32)).astype(np.int64)[keep]),
            "media_b": pa.array(
                (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)[keep]),
            "hamming": pa.array(ham[keep].astype(np.int64)),
        })

    return (sigs.map_batches(_explode, batch_format="pyarrow")
            .groupby("bucket_part")
            .map_groups(lambda t: _phash_pair_scan(
                t.drop_columns(["bucket_part"]), P),
                batch_format="pyarrow")
            .groupby("pair_part")
            .map_groups(lambda t: _dedup_verify(
                t.drop_columns(["pair_part"])), batch_format="pyarrow"))
