"""H.264 baseline I_PCM codec: bit I/O, SPS/PPS, NAL emulation
prevention, lossless sample round-trip, and MP4 integration."""

import numpy as np
import pytest

from bento_ray.h264codec import (
    _BitReader,
    _BitWriter,
    _nal_to_rbsp,
    _parse_pps,
    _parse_sps,
    _rbsp_to_nal,
    _rgb_to_ycbcr420,
    _ycbcr420_to_rgb,
    build_avcc,
    decode_avc_sample,
    encode_avc_iframes,
    parse_avcc,
)
from bento_ray.mediaerrors import MediaDecodeError


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    ue_vals = [0, 1, 2, 3, 7, 8, 25, 255, 100_000]
    se_vals = [0, 1, -1, 2, -2, 40, -40, 2047]
    for v in ue_vals:
        w.ue(v)
    for v in se_vals:
        w.se(v)
    r = _BitReader(w.rbsp_trailing())
    assert [r.ue() for _ in ue_vals] == ue_vals
    assert [r.se() for _ in se_vals] == se_vals


def test_emulation_prevention_roundtrip():
    for payload in (b"\x00\x00\x00", b"\x00\x00\x01\x00\x00\x02",
                    b"\x00\x00\x03", b"ab\x00\x00\x00\x00\x01cd",
                    bytes(range(256)) * 3):
        nal = _rbsp_to_nal(payload)
        # no illegal 00 00 0x sequence survives in the NAL body
        for i in range(len(nal) - 2):
            assert not (nal[i] == 0 and nal[i + 1] == 0
                        and nal[i + 2] <= 2)
        assert _nal_to_rbsp(nal) == payload


def test_sps_pps_roundtrip_and_avcc():
    from bento_ray.h264codec import _encode_pps, _encode_sps

    sps_nal = _encode_sps(100, 30)  # crops: 112-100=12px → 6 units r
    sps = _parse_sps(_nal_to_rbsp(sps_nal))
    assert (sps["width"], sps["height"]) == (100, 30)
    assert sps["mb_w"] == 7 and sps["mb_h"] == 2
    assert sps["profile"] == 66
    pps = _parse_pps(_nal_to_rbsp(_encode_pps()))
    assert pps["pic_init_qp"] == 26 and pps["deblock_ctl"] == 1
    avcc = build_avcc(sps_nal, _encode_pps())
    sl, pl = parse_avcc(avcc)
    assert sl[0] == sps_nal and len(pl) == 1


def test_ipcm_sample_lossless_roundtrip():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (24, 32, 3), np.uint8)
              for _ in range(3)]
    avcc, samples = encode_avc_iframes(frames)
    assert len(samples) == 3
    for f, s in zip(frames, samples):
        dec = decode_avc_sample(avcc, s)
        # I_PCM is lossless in the YCbCr domain; the only loss is the
        # 4:2:0 + color-convert round trip, identical on both sides
        ref = _ycbcr420_to_rgb(*_rgb_to_ycbcr420(f))
        assert np.array_equal(dec, ref)


def test_ipcm_cropped_dims_and_zero_runs():
    rng = np.random.default_rng(12)
    f = rng.integers(0, 256, (18, 20, 3), np.uint8)
    avcc, samples = encode_avc_iframes([f])
    dec = decode_avc_sample(avcc, samples[0])
    assert dec.shape == (18, 20, 3)
    assert np.array_equal(dec, _ycbcr420_to_rgb(*_rgb_to_ycbcr420(f)))
    # all-zero frame maximizes emulation-prevention insertions
    z = np.zeros((16, 16, 3), np.uint8)
    avcc2, s2 = encode_avc_iframes([z])
    assert np.array_equal(decode_avc_sample(avcc2, s2[0]),
                          _ycbcr420_to_rgb(*_rgb_to_ycbcr420(z)))


def test_decoder_rejects_unsupported():
    rng = np.random.default_rng(13)
    f = rng.integers(0, 256, (16, 16, 3), np.uint8)
    avcc, samples = encode_avc_iframes([f])
    with pytest.raises(MediaDecodeError):
        decode_avc_sample(b"\x00bad", samples[0])
    with pytest.raises(MediaDecodeError):
        decode_avc_sample(avcc, b"\x00\x00\x00\x02\x65")  # truncated
    with pytest.raises(ValueError):
        encode_avc_iframes([np.zeros((15, 16, 3), np.uint8)])  # odd dim


def test_mp4_avc_roundtrip_and_stub_rejection():
    from bento_ray.mp4box import (
        Mp4ParseError,
        encode_mp4_avc,
        encode_mp4_stub,
        extract_video_samples,
        parse_mp4,
    )

    rng = np.random.default_rng(14)
    frames = [rng.integers(0, 256, (24, 32, 3), np.uint8)
              for _ in range(6)]
    mp4 = encode_mp4_avc(frames, fps=12)
    tr = parse_mp4(mp4)["tracks"][0]
    assert (tr["codec"], tr["width"], tr["height"],
            tr["n_samples"], tr["fps"]) == ("avc1", 32, 24, 6, 12.0)
    avcc, samples = extract_video_samples(mp4)
    assert len(samples) == 6
    for f, s in zip(frames, samples):
        assert np.array_equal(decode_avc_sample(avcc, s),
                              _ycbcr420_to_rgb(*_rgb_to_ycbcr420(f)))
    # the config-less stub is rejected at extraction, not mis-decoded
    stub = encode_mp4_stub(width=32, height=24, n_frames=4, fps=12,
                           seed=1)
    with pytest.raises(Mp4ParseError):
        extract_video_samples(stub)


def test_cavlc_intra_decode_bit_exact():
    """Predicted-macroblock path (VERDICT r4 item 3): I_4x4 and
    I_16x16 intra prediction + CAVLC residuals over every mode the
    encoder cycles through; the decoder must reproduce the encoder's
    reconstruction bit-exactly on every frame."""
    from bento_ray.h264codec import encode_avc_iframes_cavlc

    rng = np.random.default_rng(21)
    yy, xx = np.mgrid[0:48, 0:80]
    smooth = (120 + 50 * np.sin(xx / 11.0) + 40 * np.cos(yy / 7.0))
    frames = [
        np.stack([smooth, np.roll(smooth, 9, 1),
                  np.roll(smooth, 5, 0)], -1).clip(0, 255)
        .astype(np.uint8),
        rng.integers(0, 256, (48, 80, 3), dtype=np.uint8),  # noise
        np.full((48, 80, 3), 77, np.uint8),                  # flat
    ]
    avcc, samples, recons = encode_avc_iframes_cavlc(frames)
    for s, r in zip(samples, recons):
        assert np.array_equal(decode_avc_sample(avcc, s), r)
    # lossy-but-close on smooth content (sparse-residual subset)
    err = np.abs(recons[0].astype(int) - frames[0].astype(int)).mean()
    assert err < 12, err


def test_framesampler_pure_on_predicted_mp4():
    """FrameSampler reports decoder='pure' — real pixels — on an
    ordinary (non-I_PCM) all-intra CAVLC MP4, with the fingerprints
    pinned to an independent decode of the same samples."""
    import pyarrow as pa

    from bento_ray.h264codec import decode_avc_sample as dec
    from bento_ray.mediacodec import resize_bilinear
    from bento_ray.mp4box import encode_mp4_avc, extract_video_samples
    from bento_ray.multimodal import FrameSampler, _ahash64, _luma

    base = np.tile(np.linspace(30, 220, 32)[None, :, None],
                   (24, 1, 3)).astype(np.uint8)
    frames = [np.roll(base, 4 * j, axis=1) for j in range(8)]
    mp4 = encode_mp4_avc(frames, fps=12, coding="cavlc")

    t = pa.table({"media_id": pa.array([7], pa.int64()),
                  "payload": pa.array([mp4], pa.binary())})
    out = FrameSampler(k=4)(t)
    assert out.column("decoder").to_pylist() == ["pure"] * 4
    avcc, samples = extract_video_samples(mp4)
    pos = np.linspace(0, len(samples) - 1, 4).round().astype(int)
    want = [int(np.uint64(_ahash64(_luma(resize_bilinear(
        dec(avcc, samples[p]), (8, 8))))).astype(np.int64))
        for p in pos]
    assert out.column("frame_fp").to_pylist() == want


def test_cavlc_entropy_layer_fuzz():
    """CAVLC residual block encode↔decode round-trip across contexts,
    block sizes and the level-escape ladder (prefix 14/15)."""
    import random

    from bento_ray import h264cavlc as cv
    from bento_ray.h264codec import _BitReader, _BitWriter

    rng = random.Random(9)
    for _ in range(3000):
        max_coeff = rng.choice([4, 15, 16])
        nC = -1 if max_coeff == 4 else rng.choice([0, 1, 2, 3, 8, 12])
        raw = [0] * max_coeff
        for _ in range(rng.randint(0, 6)):
            raw[rng.randrange(max_coeff)] = rng.choice([-1, 1]) * \
                rng.choice([1, 2, 3, 7, 30, 200, 1000])
        coeffs = cv.quantize_for_cavlc(raw)
        w = _BitWriter()
        cv.encode_residual_block(w, coeffs, nC)
        w.u(1, 1)
        r = _BitReader(w.rbsp_trailing())
        assert cv.decode_residual_block(r, nC, max_coeff) == coeffs


def test_cavlc_refuses_unvalidated_context():
    """4 <= nC < 8 coeff_token context: refuse-loud, never desync."""
    from bento_ray.h264cavlc import decode_residual_block
    from bento_ray.h264codec import _BitReader
    from bento_ray.mediaerrors import MediaDecodeError

    with pytest.raises(MediaDecodeError):
        decode_residual_block(_BitReader(b"\xff\xff"), 5, 16)


def test_mixed_pcm_and_predicted_slice():
    """Real encoders mix I_PCM (noisy MBs) with predicted MBs in one
    slice; the decoder's nC=16 PCM-neighbor bookkeeping must hold
    against CAVLC neighbors. Bit-exact against the encoder recon."""
    from bento_ray.h264codec import encode_avc_iframes_cavlc

    rng = np.random.default_rng(33)
    yy, xx = np.mgrid[0:64, 0:96]
    smooth = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0))
    frames = [
        np.stack([smooth, np.roll(smooth, 7, 1),
                  np.roll(smooth, 3, 0)], -1).clip(0, 255)
        .astype(np.uint8),
        rng.integers(0, 256, (64, 96, 3), dtype=np.uint8),
    ]
    avcc, samples, recons = encode_avc_iframes_cavlc(frames,
                                                     allow_pcm=True)
    for s, r in zip(samples, recons):
        assert np.array_equal(decode_avc_sample(avcc, s), r)
