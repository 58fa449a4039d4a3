"""Multimodal binary-column plumbing (stubbed decoders, real Ray-side
schema/batching/actor signatures)."""

import pyarrow as pa
import pytest

import ray.data as rd

from bento_ray.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_images,
    sample_frames,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media_ds():
    t = synth_media_table(30, seed=42)
    assert t.schema.equals(MEDIA_SCHEMA)
    return rd.from_arrow(t)


def test_image_decode_stage(media_ds):
    imgs = media_ds.filter(lambda r: r["kind"] == "image")
    out = decode_images(imgs, concurrency=2).to_pandas()
    assert len(out) == 10
    assert set(["width", "height", "mean_luma", "phash64", "decoder"]) <= \
        set(out.columns)
    assert (out["decoder"] == "fake").all()  # no PIL in this container
    assert out["phash64"].nunique() > 1


def test_image_decode_deterministic(media_ds):
    imgs = media_ds.filter(lambda r: r["kind"] == "image")
    a = decode_images(imgs, concurrency=2).to_pandas().sort_values("media_id")
    b = decode_images(imgs, concurrency=2).to_pandas().sort_values("media_id")
    assert a["phash64"].tolist() == b["phash64"].tolist()
    assert a["mean_luma"].tolist() == b["mean_luma"].tolist()


def test_audio_features_stage(media_ds):
    aud = media_ds.filter(lambda r: r["kind"] == "audio")
    out = audio_features(aud, concurrency=2).to_pandas()
    assert len(out) == 10
    assert (out["n_samples"] > 0).all()
    assert (out["rms"] > 0).all()


def test_frame_sampler_one_to_many(media_ds):
    vid = media_ds.filter(lambda r: r["kind"] == "video")
    out = sample_frames(vid, k=4, concurrency=2).to_pandas()
    assert len(out) == 10 * 4
    per = out.groupby("media_id")["frame_idx"].apply(list)
    assert all(sorted(v) == [0, 1, 2, 3] for v in per)
