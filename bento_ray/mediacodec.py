"""Pure-Python + numpy media codecs for the multimodal stages.

This sandbox has no PIL/ffmpeg/soundfile, but several mainstream
container formats need nothing beyond the stdlib to decode:

- PNG   — zlib (stdlib) inflate + scanline un-filtering (numpy);
          8/16-bit gray / gray+alpha / RGB / RGBA / palette,
          non-interlaced (interlaced Adam7 raises → caller falls back).
- BMP   — uncompressed BI_RGB 8/24/32-bit (BITMAPINFOHEADER family).
- PPM/PGM — binary P5/P6, maxval ≤ 65535.
- GIF   — LZW decode, first frame or all frames (animated GIFs give the
          FrameSampler a *real* video-ish decode path).
- WAV   — RIFF/WAVE PCM 8/16/24/32-bit int and 32/64-bit float.
- JPEG  — baseline AND progressive (jpegcodec.py): table-driven
          Huffman + numpy IDCT, any sampling up to 2x2, restart
          intervals, multi-scan spectral selection + successive
          approximation. Arithmetic/12-bit raise → caller falls back.

Encoders (PNG, PPM, BMP, WAV, GIF, baseline JPEG) exist so tests and
the synthetic media corpus can round-trip real payloads instead of
random bytes.

Real video codecs (H.264 etc.) stay out of scope; callers keep their
clearly-marked deterministic fallback for those MIME types (animated
GIF is the real frame-decode path).

Reference behavior anchor: the reference repo treats media as opaque
bytes on the message (`/root/reference/internal/message/part.go`) and
leaves decoding to user plugins; these codecs implement the decode
plugins a training-data pipeline would register.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_image", "decode_png", "decode_bmp", "decode_pnm",
    "decode_gif", "decode_gif_frames", "decode_wav", "decode_jpeg",
    "encode_png", "encode_ppm", "encode_bmp", "encode_wav", "encode_gif",
    "encode_jpeg", "encode_jpeg_progressive", "resize_nearest", "resize_bilinear", "sniff_format",
]


# Payload is not decodable by the pure codecs (unsupported sub-format
# or corrupt) — callers fall back to their stub path. Defined in a
# leaf module so jpegcodec raises the SAME class under either import
# order; re-exported here for existing `mediacodec.MediaDecodeError`
# call sites.
from bento_ray.mediaerrors import MediaDecodeError  # noqa: E402,F401


# ---------------------------------------------------------------------------
# format sniffing

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Best-effort container sniff from magic bytes. Returns one of
    'png' 'bmp' 'pnm' 'gif' 'wav' 'jpeg' or None."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload[:2] in (b"P5", b"P6") and (len(payload) > 2 and payload[2:3].isspace()):
        return "pnm"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if len(payload) > 11 and payload[4:8] == b"ftyp":
        return "mp4"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes → (H, W, 3) uint8 RGB array.

    Raises MediaDecodeError for formats the pure codecs can't handle
    (jpeg, webp, …) so the calling stage can take its fallback path."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return _to_rgb(decode_png(payload))
    if fmt == "bmp":
        return _to_rgb(decode_bmp(payload))
    if fmt == "pnm":
        return _to_rgb(decode_pnm(payload))
    if fmt == "gif":
        return _to_rgb(decode_gif(payload))
    if fmt == "jpeg":
        from bento_ray.jpegcodec import decode_jpeg

        return _to_rgb(decode_jpeg(payload))
    raise MediaDecodeError(f"unsupported image container: {fmt or 'unknown'}")


def _to_rgb(px: np.ndarray) -> np.ndarray:
    """Normalize any decoded plane layout to (H, W, 3) uint8 RGB."""
    if px.dtype == np.uint16:
        px = (px >> 8).astype(np.uint8)
    if px.ndim == 2:
        return np.repeat(px[:, :, None], 3, axis=2)
    if px.shape[2] == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    if px.shape[2] == 4:  # drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    return px


# ---------------------------------------------------------------------------
# PNG

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def decode_png(payload: bytes) -> np.ndarray:
    """→ uint8/uint16 array, (H, W) gray or (H, W, C). Non-interlaced,
    bit depths 1/2/4/8/16, color types 0/2/3/4/6."""
    if not payload.startswith(_PNG_SIG):
        raise MediaDecodeError("not a PNG")
    width = height = None
    bitdepth = ctype = interlace = 0
    idat = []
    palette = None
    trns = None
    for name, data in _png_chunks(payload):
        if name == b"IHDR":
            width, height, bitdepth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif name == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif name == b"tRNS":
            trns = data
        elif name == b"IDAT":
            idat.append(data)
    if width is None or not idat:
        raise MediaDecodeError("PNG missing IHDR/IDAT")
    if interlace:
        raise MediaDecodeError("interlaced PNG unsupported")
    if ctype not in _PNG_CHANNELS:
        raise MediaDecodeError(f"PNG color type {ctype}")
    channels = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))

    bits_per_px = channels * bitdepth
    stride = (width * bits_per_px + 7) // 8  # bytes of filtered data per line
    bpp = max(1, bits_per_px // 8)           # filter step in whole bytes
    expect = (stride + 1) * height
    if len(raw) < expect:
        raise MediaDecodeError("PNG IDAT truncated")
    lines = np.frombuffer(raw[:expect], np.uint8).reshape(height, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:].copy()
    recon = _png_unfilter(data, filters, bpp)

    if bitdepth == 8:
        px = recon.reshape(height, width, channels)
    elif bitdepth == 16:
        by = recon.reshape(height, width * channels * 2)
        px = ((by[:, ::2].astype(np.uint16) << 8) | by[:, 1::2]) \
            .reshape(height, width, channels)
    else:  # 1/2/4-bit gray or palette: unpack bits per line
        unpacked = np.unpackbits(recon, axis=1)
        per = bitdepth
        vals = unpacked[:, :width * per].reshape(height, width, per)
        weights = (1 << np.arange(per - 1, -1, -1)).astype(np.uint8)
        px = (vals * weights).sum(axis=2).astype(np.uint8)
        if ctype == 0:  # scale to full 8-bit range
            px = (px * (255 // ((1 << per) - 1))).astype(np.uint8)
        px = px.reshape(height, width, 1)

    if ctype == 3:
        if palette is None:
            raise MediaDecodeError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        out = palette[idx]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            a = np.frombuffer(trns, np.uint8)
            alpha[:len(a)] = a
            out = np.dstack([out, alpha[idx]])
        return out
    if channels == 1:
        return px[:, :, 0]
    return px


def _png_unfilter(data: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters in place. Filters 0 (None)
    and 2 (Up) vectorize across the line; 1 (Sub) vectorizes via a
    modular cumulative sum over stride-bpp lanes; 3 (Average) and
    4 (Paeth) walk the line in bpp-wide steps (the left-neighbor
    dependency is inherently sequential)."""
    height, stride = data.shape
    prior = np.zeros(stride, np.uint8)
    pad = (-stride) % bpp
    for y in range(height):
        f = filters[y]
        line = data[y]
        if f == 0:
            pass
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            lanes = np.concatenate([line, np.zeros(pad, np.uint8)]) \
                .reshape(-1, bpp)
            np.add.accumulate(lanes, axis=0, dtype=np.uint8, out=lanes)
            line[:] = lanes.reshape(-1)[:stride]
        elif f == 2:  # Up
            line += prior
        elif f == 3:  # Average
            half = prior >> 1  # first bpp bytes: left=0
            line[:bpp] += half[:bpp]
            for x in range(bpp, stride):
                line[x] += (int(line[x - bpp]) + int(prior[x])) >> 1
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise MediaDecodeError(f"PNG filter {f}")
        prior = line
    return data


def encode_png(px: np.ndarray, level: int = 6) -> bytes:
    """(H, W[, C]) uint8 → PNG bytes (filter 0, one IDAT)."""
    px = np.ascontiguousarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * c)], axis=1)
    idat = zlib.compress(lines.tobytes(), level)

    def chunk(name: bytes, data: bytes) -> bytes:
        body = name + data
        return struct.pack(">I", len(data)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + \
        chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"BM") or len(payload) < 54:
        raise MediaDecodeError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise MediaDecodeError("BITMAPCOREHEADER unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression not in (0, 3) or bpp not in (8, 24, 32):
        raise MediaDecodeError(f"BMP bpp={bpp} compression={compression}")
    flip = height > 0
    height = abs(height)
    row_bytes = (width * bpp // 8 + 3) & ~3
    need = data_off + row_bytes * height
    if len(payload) < need:
        raise MediaDecodeError("BMP pixel data truncated")
    rows = np.frombuffer(payload, np.uint8, row_bytes * height, data_off) \
        .reshape(height, row_bytes)
    if flip:
        rows = rows[::-1]
    if bpp == 8:
        pal_off = 14 + hdr_size
        pal = np.frombuffer(payload, np.uint8, 256 * 4, pal_off) \
            .reshape(256, 4)[:, :3][:, ::-1]  # BGRA table → RGB
        return pal[rows[:, :width]]
    step = bpp // 8
    px = rows[:, :width * step].reshape(height, width, step)
    return np.ascontiguousarray(px[:, :, 2::-1])  # BGR(A) → RGB


def encode_bmp(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP."""
    px = np.ascontiguousarray(px, np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), np.uint8)
    body[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
    return header + dib + data


# ---------------------------------------------------------------------------
# PNM (PPM/PGM binary)

def decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise MediaDecodeError("not a binary PNM")
    # header: magic, width, height, maxval — '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    channels = 3 if magic == b"P6" else 1
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    count = width * height * channels
    arr = np.frombuffer(payload, dtype, count, pos)
    px = arr.reshape(height, width, channels).astype(
        np.uint8 if maxval < 256 else np.uint16)
    return px[:, :, 0] if channels == 1 else px


def encode_ppm(px: np.ndarray) -> bytes:
    px = np.ascontiguousarray(px, np.uint8)
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


# ---------------------------------------------------------------------------
# GIF (LZW) — gives FrameSampler a real multi-frame decode path

def _gif_lzw(min_code: int, data: bytes, npix: int) -> np.ndarray:
    """Decode GIF LZW-compressed index stream → uint8 index array."""
    clear = 1 << min_code
    end = clear + 1
    out = np.empty(npix, np.uint8)
    n_out = 0
    # bit reader over the whole sub-block-joined buffer
    bitbuf = bitlen = 0
    pos = 0
    code_size = min_code + 1
    dict_codes: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while n_out < npix:
        while bitlen < code_size:
            if pos >= len(data):
                return out[:n_out]
            bitbuf |= data[pos] << bitlen
            bitlen += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitlen -= code_size
        if code == clear:
            dict_codes = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(dict_codes):
            entry = dict_codes[code]
        elif code == len(dict_codes) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise MediaDecodeError("corrupt GIF LZW stream")
        take = min(len(entry), npix - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and len(dict_codes) < 4096:
            dict_codes.append(prev + entry[:1])
            if len(dict_codes) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out[:n_out]


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """Yield (H, W, 3) uint8 RGB frames. Disposal handling: each frame
    is composited onto the previous canvas (method 1 semantics; method
    2 restores background) — enough for feature extraction."""
    if not payload.startswith((b"GIF87a", b"GIF89a")):
        raise MediaDecodeError("not a GIF")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, size * 3, pos).reshape(-1, 3)
        pos += size * 3
    canvas = np.zeros((sh, sw, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[bg] if bg < len(gct) else 0
    transparent = None
    disposal = 0
    emitted = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 7
                transparent = payload[pos + 4] if gflags & 1 else None
            while payload[pos] != 0:       # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:  # image descriptor expected
            raise MediaDecodeError(f"unexpected GIF block 0x{block:02x}")
        x, y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            size = 2 << (iflags & 7)
            table = np.frombuffer(payload, np.uint8, size * 3, pos) \
                .reshape(-1, 3)
            pos += size * 3
        if table is None:
            raise MediaDecodeError("GIF frame with no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw(min_code, b"".join(chunks), w * h)
        if len(idx) < w * h:
            idx = np.pad(idx, (0, w * h - len(idx)))
        idx = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: reorder rows (Adam4 for GIF)
            order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                    np.arange(2, h, 4), np.arange(1, h, 2)])
            deinter = np.empty_like(idx)
            deinter[order] = idx
            idx = deinter
        region = canvas[y:y + h, x:x + w]
        rgb = table[np.clip(idx, 0, len(table) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        yield canvas.copy()
        emitted += 1
        if max_frames is not None and emitted >= max_frames:
            return
        if disposal == 2 and gct is not None:
            canvas[y:y + h, x:x + w] = gct[bg] if bg < len(gct) else 0


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame only, (H, W, 3) uint8."""
    for frame in decode_gif_frames(payload, max_frames=1):
        return frame
    raise MediaDecodeError("GIF contains no image data")


def encode_gif(frames, loop: bool = True) -> bytes:
    """Encode uint8 RGB frames as an (animated) GIF with a 216-color
    web-safe cube — lossy but deterministic; enough to give tests a
    real multi-frame container. LZW output uses 8-bit min code size."""
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    # 6x6x6 color cube in a 256-entry table
    levels = np.array([0, 51, 102, 153, 204, 255], np.uint8)
    cube = np.zeros((256, 3), np.uint8)
    i = 0
    for r in levels:
        for g in levels:
            for b in levels:
                cube[i] = (r, g, b)
                i += 1
    out = [b"GIF89a", struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0),
           cube.tobytes()]
    if loop and len(frames) > 1:
        out.append(b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00")
    for f in frames:
        if f.ndim == 2:
            f = np.repeat(f[:, :, None], 3, axis=2)
        q = (f.astype(np.int32) + 25) // 51  # nearest cube level
        idx = (q[:, :, 0] * 36 + q[:, :, 1] * 6 + q[:, :, 2]).astype(np.uint8)
        if len(frames) > 1:
            out.append(b"\x21\xF9\x04\x00\x0A\x00\x00\x00")  # 100ms delay
        out.append(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
        out.append(b"\x08")  # LZW min code size
        out.append(_gif_lzw_encode(idx.reshape(-1)))
        out.append(b"\x00")
    out.append(b"\x3B")
    return b"".join(out)


def _gif_lzw_encode(indices: np.ndarray) -> bytes:
    """Simple LZW encoder (min code 8) emitting length-prefixed
    sub-blocks."""
    clear, end = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_size = 9
    bitbuf = bitlen = 0
    payload = bytearray()

    def emit(code: int):
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += code_size
        while bitlen >= 8:
            payload.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    emit(clear)
    seq = b""
    data = indices.tobytes()
    for byte in data:
        nxt = seq + bytes([byte])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(256)}
            next_code, code_size = 258, 9
        seq = bytes([byte])
    if seq:
        emit(table[seq])
    emit(end)
    if bitlen:
        payload.append(bitbuf & 0xFF)
    blocks = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    return bytes(blocks)


# ---------------------------------------------------------------------------
# WAV

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (float32 samples in [-1, 1] shaped (n,) mono or
    (n, ch), sample_rate). PCM 8/16/24/32-bit int and IEEE float."""
    if not payload.startswith(b"RIFF") or payload[8:12] != b"WAVE":
        raise MediaDecodeError("not a WAV")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise MediaDecodeError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _bps, _align, bits = fmt
    if audio_format == 0xFFFE and len(data) >= 0:  # extensible: trust bits
        audio_format = 1
    if audio_format == 1:  # PCM int
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128) / 128
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            vals = (raw[:, 0].astype(np.int32)
                    | raw[:, 1].astype(np.int32) << 8
                    | raw[:, 2].astype(np.int32) << 16)
            vals = (vals ^ 0x800000) - 0x800000  # sign-extend
            x = vals.astype(np.float32) / 8388608
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648
        else:
            raise MediaDecodeError(f"WAV PCM bits={bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8") \
            .astype(np.float32)
    else:
        raise MediaDecodeError(f"WAV format {audio_format}")
    if channels > 1:
        x = x[:len(x) - len(x) % channels].reshape(-1, channels)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float in [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV."""
    x = np.asarray(samples, np.float32)
    channels = 1 if x.ndim == 1 else x.shape[1]
    pcm = np.clip(np.round(x * 32767), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


# ---------------------------------------------------------------------------
# resize

def resize_nearest(px: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """(H, W[, C]) → (h, w[, C]) by nearest-neighbor sampling;
    size is (width, height) following the PIL convention."""
    w, h = size
    src_h, src_w = px.shape[:2]
    rows = np.minimum((np.arange(h) + 0.5) * src_h / h, src_h - 1) \
        .astype(np.int64)
    cols = np.minimum((np.arange(w) + 0.5) * src_w / w, src_w - 1) \
        .astype(np.int64)
    return px[rows][:, cols]


def resize_bilinear(px: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """(H, W[, C]) uint8 → (h, w[, C]) uint8, align-corners=False
    bilinear (the OpenCV/PIL default geometry)."""
    w, h = size
    src_h, src_w = px.shape[:2]
    x = np.clip((np.arange(w) + 0.5) * src_w / w - 0.5, 0, src_w - 1)
    y = np.clip((np.arange(h) + 0.5) * src_h / h - 0.5, 0, src_h - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, src_w - 1)
    y1 = np.minimum(y0 + 1, src_h - 1)
    fx = (x - x0)[None, :]
    fy = (y - y0)[:, None]
    if px.ndim == 3:
        fx = fx[:, :, None]
        fy = fy[:, :, None]
    p = px.astype(np.float32)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.round(out).astype(np.uint8)


# baseline JPEG codec lives in its own module; re-export here so the
# media surface is one import (placed after MediaDecodeError so the
# codec binds the shared exception class)
from bento_ray.jpegcodec import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
