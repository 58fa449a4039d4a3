"""Pure-Python media codecs (bento_ray.mediacodec): encoder↔decoder
round-trips, plus PNG un-filtering validated against an INDEPENDENT
per-spec forward-filter implementation (so both sides of the
round-trip can't share a bug)."""

import struct
import zlib

import numpy as np
import pytest

from bento_ray import mediacodec as mc


def _chunk(name: bytes, data: bytes) -> bytes:
    body = name + data
    return struct.pack(">I", len(data)) + body + \
        struct.pack(">I", zlib.crc32(body))


def _forward_filter(px: np.ndarray, ftypes) -> bytes:
    """Per-spec PNG forward filtering — independent scalar reference."""
    h, w, c = px.shape
    raw = px.reshape(h, w * c).astype(np.int32)
    bpp = c
    out = bytearray()
    prior = np.zeros(w * c, np.int32)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        out.append(f)
        line = raw[y]
        for x in range(w * c):
            a = line[x - bpp] if x >= bpp else 0
            b = prior[x]
            cc = prior[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb and pa_ <= pc_ else \
                    (b if pb <= pc_ else cc)
            out.append((line[x] - pred) & 0xFF)
        prior = line
    return bytes(out)


def _make_png(px: np.ndarray, ftypes) -> bytes:
    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(_forward_filter(px, ftypes))
    return mc._PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + \
        _chunk(b"IEND", b"")


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4],
                                    [0, 1, 2, 3, 4], [4, 3, 2, 1, 0]])
def test_png_unfilter_against_independent_forward(channels, ftypes):
    rng = np.random.default_rng(channels * 100 + sum(ftypes))
    px = rng.integers(0, 256, (13, 9, channels), dtype=np.uint8)
    got = mc.decode_png(_make_png(px, ftypes))
    want = px[:, :, 0] if channels == 1 else px
    assert got.shape == want.shape and (got == want).all()


def test_png_roundtrip_rgb_gray_rgba():
    rng = np.random.default_rng(7)
    for shape in [(23, 17, 3), (6, 5, 4)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (mc.decode_png(mc.encode_png(px)) == px).all()
    g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    assert (mc.decode_png(mc.encode_png(g)) == g).all()


def test_png_palette_and_trns():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (7, 5), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 5, 7, 8, 3, 0, 0, 0)
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(7))
    png = mc._PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"PLTE", pal.tobytes()) + \
        _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    assert (mc.decode_png(png) == pal[idx]).all()


def test_png_16bit_and_low_depths():
    rng = np.random.default_rng(3)
    g16 = rng.integers(0, 65536, (4, 6), dtype=np.uint16)
    ihdr = struct.pack(">IIBBBBB", 6, 4, 16, 0, 0, 0, 0)
    lines = b"".join(b"\x00" + g16[y].astype(">u2").tobytes()
                     for y in range(4))
    png = mc._PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
    got = mc.decode_png(png)
    assert got.dtype == np.uint16 and (got == g16).all()

    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        gg = rng.integers(0, maxv + 1, (5, 11), dtype=np.uint8)

        def packline(line):
            bits = np.unpackbits(line[:, None], axis=1, count=8)[:, 8 - depth:]
            return np.packbits(bits.reshape(-1)).tobytes()

        ihdr = struct.pack(">IIBBBBB", 11, 5, depth, 0, 0, 0, 0)
        lines = b"".join(b"\x00" + packline(gg[y]) for y in range(5))
        png = mc._PNG_SIG + _chunk(b"IHDR", ihdr) + \
            _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")
        assert (mc.decode_png(png) == (gg * (255 // maxv))
                .astype(np.uint8)).all()


def test_png_interlaced_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    png = mc._PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(b"\x00" * 52)) + _chunk(b"IEND", b"")
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_png(png)


def test_bmp_roundtrip_and_dispatch():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (15, 10, 3), dtype=np.uint8)
    b = mc.encode_bmp(px)
    assert (mc.decode_bmp(b) == px).all()
    assert (mc.decode_image(b) == px).all()
    assert mc.sniff_format(b) == "bmp"


def test_pnm_roundtrip_with_comment():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    body = mc.encode_ppm(px)
    # splice a comment into the header — the parser must skip it
    commented = body.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert (mc.decode_pnm(commented) == px).all()


def test_gif_animated_roundtrip():
    rng = np.random.default_rng(17)
    levels = np.array([0, 51, 102, 153, 204, 255], np.uint8)
    base = levels[rng.integers(0, 6, (20, 30, 3))]
    frames = [base, np.roll(base, 5, axis=1), np.roll(base, 3, axis=0)]
    gb = mc.encode_gif(frames)
    decoded = list(mc.decode_gif_frames(gb))
    assert len(decoded) == 3
    for f_in, f_out in zip(frames, decoded):
        assert (f_in == f_out).all()
    assert (mc.decode_gif(gb) == frames[0]).all()
    assert (mc.decode_image(gb) == frames[0]).all()


def test_wav_roundtrip_mono_stereo_and_formats():
    t = np.linspace(0, 1, 1600, dtype=np.float32)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    dec, rate = mc.decode_wav(mc.encode_wav(sig, 16000))
    assert rate == 16000 and np.abs(dec - sig).max() < 1e-3
    stereo = np.stack([sig, -sig], 1)
    dec2, _ = mc.decode_wav(mc.encode_wav(stereo))
    assert dec2.shape == stereo.shape and np.abs(dec2 - stereo).max() < 1e-3

    # hand-built IEEE-float WAV
    data = sig.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    dec3, _ = mc.decode_wav(wav)
    assert np.abs(dec3 - sig).max() < 1e-6

    # hand-built 24-bit PCM
    i24 = np.round(sig * 8388607).astype(np.int32)
    raw = bytearray()
    for v in i24:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 48000, 3, 24)
    wav24 = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
             + b"fmt " + struct.pack("<I", 16) + fmt
             + b"data" + struct.pack("<I", len(raw)) + bytes(raw))
    dec4, _ = mc.decode_wav(wav24)
    assert np.abs(dec4 - sig).max() < 1e-6


def test_resize_shapes_and_identity():
    rng = np.random.default_rng(19)
    px = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    assert mc.resize_nearest(px, (8, 8)).shape == (8, 8, 3)
    assert mc.resize_bilinear(px, (8, 8)).shape == (8, 8, 3)
    # constant image stays constant under bilinear
    const = np.full((16, 16, 3), 77, np.uint8)
    assert (mc.resize_bilinear(const, (5, 9)) == 77).all()
    # same-size resize is identity for nearest
    assert (mc.resize_nearest(px, (17, 23)) == px).all()


def test_decode_image_rejects_garbage_jpeg():
    """JPEG magic followed by junk must raise (callers' fallback path),
    never loop or throw a non-MediaDecodeError."""
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_image(b"\xff\xd8\xff\xe0" + b"x" * 50)
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_image(b"\xff\xd8\xff\xe0" + bytes(range(200)))


def _photo(h=80, w=64, seed=3):
    rng = np.random.RandomState(seed)
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    base = (x[None, :] + y[:, None]) / 2
    img = np.stack([base, base[::-1], np.full_like(base, 128)], -1)
    return np.clip(img + rng.randint(-8, 8, img.shape), 0, 255) \
        .astype(np.uint8)


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("quality", [95, 70])
def test_jpeg_roundtrip(subsample, quality):
    img = _photo()
    b = mc.encode_jpeg(img, quality=quality, subsample=subsample)
    assert b.startswith(b"\xff\xd8") and b.endswith(b"\xff\xd9")
    out = mc.decode_jpeg(b)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    # lossy, but bounded: smooth content at q>=70 stays within
    # quantization error
    assert err.mean() < 6.0 and err.max() < 40, (err.mean(), err.max())
    # higher quality must not be worse on the same content
    if quality == 95 and not subsample:
        worse = mc.decode_jpeg(mc.encode_jpeg(img, quality=40))
        assert err.mean() <= np.abs(
            worse.astype(int) - img.astype(int)).mean() + 0.1


def test_jpeg_flat_color_near_exact():
    img = np.full((24, 24, 3), 100, np.uint8)
    out = mc.decode_jpeg(mc.encode_jpeg(img, quality=95))
    assert np.abs(out.astype(int) - 100).max() <= 1


def test_jpeg_grayscale_and_odd_dims():
    img = _photo(37, 29)[:, :, 0]
    out = mc.decode_jpeg(mc.encode_jpeg(img, quality=90))
    assert out.shape == (37, 29)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 5.0
    # via the dispatch: grayscale promotes to RGB
    rgb = mc.decode_image(mc.encode_jpeg(img, quality=90))
    assert rgb.shape == (37, 29, 3)


def test_jpeg_restart_markers():
    img = _photo(48, 48, seed=9)
    plain = mc.decode_jpeg(mc.encode_jpeg(img, quality=85))
    rst = mc.decode_jpeg(mc.encode_jpeg(img, quality=85, restart=3))
    # restart intervals change the stream layout, not the pixels
    assert (plain == rst).all()


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_progressive_pixel_identical(subsample):
    """Progressive and baseline streams of the same image hold the
    same quantized coefficients — decode must be BYTE-IDENTICAL. This
    exercises all four progressive scan paths (DC/AC x first/refine),
    EOB runs and the correction-bit algorithm."""
    for img in (_photo(80, 64), _photo(37, 29, seed=5)):
        for q in (90, 50):
            d0 = mc.decode_jpeg(mc.encode_jpeg(img, quality=q,
                                               subsample=subsample))
            dp = mc.decode_jpeg(mc.encode_jpeg_progressive(
                img, quality=q, subsample=subsample))
            assert (d0 == dp).all()


def test_jpeg_progressive_eobrun_and_refine_stress():
    """Flat regions produce long EOB runs; dense noise produces heavy
    refinement correction-bit traffic; both must round-trip."""
    rng = np.random.RandomState(99)
    flat = np.full((128, 128, 3), 77, np.uint8)
    noise = rng.randint(0, 256, (96, 96, 3)).astype(np.uint8)
    mixed = np.concatenate([flat[:64, :96], noise[:64]], axis=0)
    for img in (flat, noise, mixed):
        d0 = mc.decode_jpeg(mc.encode_jpeg(img, quality=75))
        dp = mc.decode_jpeg(mc.encode_jpeg_progressive(img, quality=75))
        assert (d0 == dp).all()
    # grayscale progressive via the dispatch
    g = noise[:21, :13, 0]
    assert (mc.decode_image(mc.encode_jpeg_progressive(g, quality=85))
            == mc.decode_image(mc.encode_jpeg(g, quality=85))).all()


def test_jpeg_bad_progressive_scan_header_rejected():
    """A baseline stream mislabeled SOF2 has an illegal progressive
    scan header (Ss=0, Se=63) and must raise cleanly."""
    b = bytearray(mc.encode_jpeg(_photo(16, 16), quality=85))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_jpeg(bytes(b))


def test_jpeg_deterministic():
    img = _photo(32, 32, seed=11)
    assert mc.encode_jpeg(img, 80) == mc.encode_jpeg(img, 80)


def test_mp4_container_parse_and_errors():
    from bento_ray.mp4box import Mp4ParseError, encode_mp4_stub, parse_mp4

    b = encode_mp4_stub(width=320, height=240, n_frames=48, fps=24, seed=3)
    assert mc.sniff_format(b) == "mp4"
    m = parse_mp4(b)
    t = m["tracks"][0]
    assert (m["brand"], t["codec"], t["width"], t["height"],
            t["n_samples"], t["fps"]) == ("isom", "avc1", 320, 240, 48, 24.0)
    assert m["duration_ms"] == 2000 and t["duration_ms"] == 2000
    # deterministic
    assert b == encode_mp4_stub(width=320, height=240, n_frames=48,
                                fps=24, seed=3)
    with pytest.raises(Mp4ParseError):
        parse_mp4(b"\x00\x00\x00\x08free" + b"\x00" * 64)  # no ftyp
    with pytest.raises(Mp4ParseError):
        parse_mp4(b[:40])  # moov truncated away
