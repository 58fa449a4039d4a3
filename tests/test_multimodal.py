"""Multimodal binary-column stages: REAL pure-codec decode for
PNG/GIF/WAV payloads (mediacodec), deterministic fake fallback for
containers the sandbox can't decode (JPEG), real Ray-side
schema/batching/actor signatures throughout."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from bento_ray import mediacodec as mc
from bento_ray.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_images,
    resize_images,
    sample_frames,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media_ds():
    t = synth_media_table(30, seed=42)
    assert t.schema.equals(MEDIA_SCHEMA)
    return rd.from_arrow(t)


def test_image_decode_stage(media_ds):
    imgs = media_ds.filter(expr="kind == 'image'")
    out = decode_images(imgs, concurrency=2).to_pandas()
    assert len(out) == 10
    assert set(["width", "height", "mean_luma", "phash64", "decoder"]) <= \
        set(out.columns)
    # PNG payloads decode for real; the JPEG-magic rows fall back
    by_dec = out.groupby("decoder").size().to_dict()
    assert by_dec.get("pure", 0) > 0 and by_dec.get("fake", 0) > 0
    assert "pil" not in by_dec  # no PIL in this container
    # real dimensions come from the container, not the thumb size
    pure = out[out["decoder"] == "pure"]
    meta = media_ds.filter(expr="kind == 'image'").to_pandas() \
        .set_index("media_id")
    for _, row in pure.iterrows():
        assert row["width"] == meta.loc[row["media_id"], "meta_width"]
        assert row["height"] == meta.loc[row["media_id"], "meta_height"]
    assert out["phash64"].nunique() > 1


def test_image_decode_deterministic(media_ds):
    imgs = media_ds.filter(expr="kind == 'image'")
    a = decode_images(imgs, concurrency=2).to_pandas().sort_values("media_id")
    b = decode_images(imgs, concurrency=2).to_pandas().sort_values("media_id")
    assert a["phash64"].tolist() == b["phash64"].tolist()
    assert a["mean_luma"].tolist() == b["mean_luma"].tolist()


def test_image_resize_stage(media_ds):
    imgs = media_ds.filter(expr="kind == 'image'")
    out = resize_images(imgs, 10, 7, concurrency=2).to_pandas()
    pure = out[out["decoder"] == "pure"]
    assert len(pure) > 0
    for _, row in pure.iterrows():
        px = mc.decode_png(row["payload"])
        assert px.shape == (7, 10, 3)
        assert row["meta_width"] == 10 and row["meta_height"] == 7
    # undecodable rows pass through byte-identical
    fake = out[out["decoder"] == "fake"]
    orig = imgs.to_pandas().set_index("media_id")
    for _, row in fake.iterrows():
        assert row["payload"] == orig.loc[row["media_id"], "payload"]


def test_audio_features_stage(media_ds):
    aud = media_ds.filter(expr="kind == 'audio'")
    out = audio_features(aud, concurrency=2).to_pandas()
    assert len(out) == 10
    assert (out["decoder"] == "pure").all()  # real WAV decode
    assert (out["sample_rate"] == 8000).all()
    assert (out["n_samples"] > 0).all()
    # a 0.5-amplitude sine has rms ≈ 0.3536
    assert np.allclose(out["rms"], 0.3536, atol=0.01)
    assert (out["zero_crossings"] > 0).all()
    # n_samples must match the synthesized duration
    meta = aud.to_pandas().set_index("media_id")
    for _, row in out.iterrows():
        dur = meta.loc[row["media_id"], "meta_duration_ms"]
        assert row["n_samples"] == int(8000 * dur / 1000)


def test_frame_sampler_real_gif_frames(media_ds):
    vid = media_ds.filter(expr="kind == 'video'")
    out = sample_frames(vid, k=4, concurrency=2).to_pandas()
    assert len(out) == 10 * 4
    # GIF rows decode real frames; MP4 rows with real H.264 (I_PCM
    # baseline, media_id % 12 == 5) decode real pixels too; the
    # dummy-sample MP4 stub (media_id % 12 == 11) takes the fallback
    meta = vid.to_pandas().set_index("media_id")
    dec = out.set_index("media_id")["decoder"]
    mimes = meta["mime"]
    assert (dec.loc[mimes[mimes == "image/gif"].index] == "pure").all()
    mp4_ids = mimes[mimes == "video/mp4"].index
    real_mp4 = [i for i in mp4_ids if i % 12 == 5]
    stub_mp4 = [i for i in mp4_ids if i % 12 == 11]
    assert real_mp4 and stub_mp4
    assert (dec.loc[real_mp4] == "pure").all()
    assert (dec.loc[stub_mp4] == "fake").all()
    per = out.groupby("media_id")["frame_idx"].apply(list)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per)
    # rolled frames differ → fingerprints should vary within a video
    nunique = out.groupby("media_id")["frame_fp"].nunique()
    assert (nunique > 1).any()


def test_frame_sampler_fallback_for_non_gif():
    t = pa.Table.from_pydict({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["video"], pa.string()),
        "mime": pa.array(["video/mp4"], pa.string()),
        "payload": pa.array([b"\x00\x00\x00\x18ftypmp42" + b"x" * 100],
                            pa.binary()),
        "meta_width": pa.array([0], pa.int32()),
        "meta_height": pa.array([0], pa.int32()),
        "meta_duration_ms": pa.array([0], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = sample_frames(rd.from_arrow(t), k=3).to_pandas()
    assert len(out) == 3
    assert (out["decoder"] == "fake").all()


def test_real_jpeg_rows_decode_pure(media_ds):
    """The corpus' valid baseline-JPEG rows take the REAL decode path
    (decoder='pure'); only the garbage-JPEG rows fall back."""
    import pandas as pd

    imgs = media_ds.filter(expr="mime == 'image/jpeg'")
    out = decode_images(imgs, concurrency=2).to_pandas()
    meta = imgs.to_pandas().set_index("media_id")
    valid = meta[meta["meta_width"] > 0].index
    garbage = meta[meta["meta_width"] == 0].index
    assert len(valid) > 0 and len(garbage) > 0
    by_id = out.set_index("media_id")["decoder"]
    assert (by_id.loc[valid] == "pure").all()
    assert (by_id.loc[garbage] == "fake").all()


def test_progressive_jpeg_decodes_pure():
    """Progressive JPEG is a REAL decode path (jpegcodec handles SOF2),
    not a fake fallback — the decoder tag must say 'pure'."""
    import numpy as np

    from bento_ray.mediacodec import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    payload = encode_jpeg_progressive(img, quality=85)
    t = pa.Table.from_pydict({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "mime": pa.array(["image/jpeg"], pa.string()),
        "payload": pa.array([payload], pa.binary()),
        "meta_width": pa.array([48], pa.int32()),
        "meta_height": pa.array([32], pa.int32()),
        "meta_duration_ms": pa.array([0], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = decode_images(rd.from_arrow(t)).to_pandas()
    assert out["decoder"].tolist() == ["pure"]
    assert out["width"].tolist() == [48] and out["height"].tolist() == [32]


def test_video_metadata_stage(media_ds):
    """GIF rows decode real frame metadata ('pure'); MP4 rows parse
    the ISO-BMFF box tree ('container': real metadata, frames not
    decoded)."""
    from bento_ray.multimodal import video_metadata

    vids = media_ds.filter(expr="kind == 'video'")
    out = video_metadata(vids, concurrency=2).to_pandas()
    meta = vids.to_pandas().set_index("media_id")
    assert len(out) == len(meta)
    by_dec = out.groupby("decoder").size().to_dict()
    assert by_dec.get("pure", 0) > 0 and by_dec.get("container", 0) > 0
    for _, row in out.iterrows():
        m = meta.loc[row["media_id"]]
        if row["decoder"] == "container":
            assert m["mime"] == "video/mp4"
            assert row["codec"] == "avc1"
            assert row["width"] == m["meta_width"]
            assert row["n_frames"] == 12 and row["fps"] == 12.0
            assert row["duration_ms"] == m["meta_duration_ms"]
        elif row["decoder"] == "pure":
            assert row["codec"] == "gif"
            assert row["n_frames"] == 6
            assert row["width"] == m["meta_width"]


def test_phash64_dct_properties():
    import numpy as np

    from bento_ray.multimodal import _phash64_dct
    from bento_ray.textops.dedup import _popcount64

    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, size=(32, 32)).astype(np.float64)
    # identical thumbs hash identically; a tiny perturbation moves few
    # bits; an unrelated image moves many
    b = a.copy()
    b[0, 0] += 1.0
    c = rng.integers(0, 256, size=(32, 32)).astype(np.float64)
    ha, hb, hc = (_phash64_dct(x) for x in (a, b, c))
    d_ab = int(_popcount64(np.array([ha ^ hb], np.uint64))[0])
    d_ac = int(_popcount64(np.array([ha ^ hc], np.uint64))[0])
    assert ha == _phash64_dct(a)
    assert d_ab <= 3
    assert d_ac > 10


def test_image_near_dups_exact_at_hamming3():
    import io  # noqa: F401

    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from bento_ray import mediacodec as mc
    from bento_ray.multimodal import (ImagePHash, _luma, _phash64_dct,
                                      image_near_dups)
    from bento_ray.textops.dedup import _popcount64

    rng = np.random.default_rng(9)
    payloads = []
    # 6 smooth base images (structured, so near-dups stay near), each
    # with a lightly-perturbed copy; plus 4 unrelated images
    for i in range(6):
        base = np.zeros((48, 64, 3), np.uint8)
        gx = np.linspace(0, 255, 64)[None, :]
        gy = np.linspace(0, 255, 48)[:, None]
        base[..., 0] = (gx + i * 20) % 256
        base[..., 1] = (gy * (i + 1) / 6) % 256
        base[..., 2] = ((gx + gy) / 2) % 256
        dup = base.copy()
        dup[:2, :2] ^= 3  # tiny corner change
        payloads += [mc.encode_png(base), mc.encode_png(dup)]
    for _ in range(4):
        payloads.append(mc.encode_png(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)))
    tbl = pa.table({
        "media_id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    ds = rd.from_arrow(tbl)
    out = image_near_dups(ds, max_hamming=3).to_pandas()
    got = sorted(zip(out["media_a"], out["media_b"], out["hamming"]))

    # brute-force truth with the same stage's decode + hash
    st = ImagePHash()
    hashes = [np.uint64(_phash64_dct(_luma(st._decode(p)[0])))
              for p in payloads]
    want = []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = int(_popcount64(np.array([hashes[i] ^ hashes[j]],
                                         np.uint64))[0])
            if d <= 3:
                want.append((i, j, d))
    assert got == sorted(want)
    # the laced duplicates must actually be found
    assert len(got) >= 3
