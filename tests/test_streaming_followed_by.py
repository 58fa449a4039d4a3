"""Streaming relaxed-contiguity CEP (FollowedByWorker /
run_followed_by_stream) vs the batch operator and the eager-emission
watermark semantics."""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.streaming import ExactlyOnceParquetSink
from bento_ray.streaming.engine import run_followed_by_stream

PATTERN = ["signup", "click", "purchase"]
WITHIN_US = 48 * 3_600_000_000  # 48h, matches q_cep_followed_by


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fb_stream"))
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["ts", "user_id", "event_id", "event_type"])
    df = t.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    n = len(df)
    for i in range(4):
        part = df.iloc[i * n // 4:(i + 1) * n // 4]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(d, f"events-{i:02d}.parquet"))
    return d


def _batch_truth(events_dir) -> pd.DataFrame:
    import ray.data as rd

    from bento_ray.stages.cep import match_followed_by

    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    ds = rd.read_parquet(files)
    out = match_followed_by(ds, PATTERN, within_us=WITHIN_US,
                            key_col="user_id").to_pandas()
    out = out.rename(columns={"user_id": "key"})
    return out[["key", "first_event_id", "last_event_id", "span_us"]] \
        .sort_values(["key", "first_event_id"]).reset_index(drop=True)


def _stream_result(out_dir) -> pd.DataFrame:
    df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
    return df[["key", "first_event_id", "last_event_id", "span_us"]] \
        .sort_values(["key", "first_event_id"]).reset_index(drop=True)


def test_followed_by_stream_matches_batch_operator(events_dir, tmp_path):
    out = str(tmp_path / "fb_out")
    m = run_followed_by_stream(events_dir, out, pattern=PATTERN,
                               within_us=WITHIN_US, partitions=4,
                               files_per_epoch=1)
    assert m["rows_fed"] == 1000
    got = _stream_result(out)
    want = _batch_truth(events_dir)
    pd.testing.assert_frame_equal(got, want)
    assert m["worker_metrics"]["matches_emitted"] == len(want)


def test_followed_by_chain_emits_eagerly_with_gaps(tmp_path):
    """A chain whose steps arrive in different epochs (with intervening
    noise events — relaxed contiguity) emits exactly once, in the epoch
    whose watermark passes its TAIL, not the start's timeout."""
    US = 1_000_000
    d = str(tmp_path / "in")
    os.makedirs(d)
    # epoch 0: signup @100s + noise
    pq.write_table(pa.table({
        "ts": pa.array([100 * US, 110 * US], pa.timestamp("us")),
        "user_id": pa.array([7, 7], pa.int64()),
        "event_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["signup", "view"]),
    }), os.path.join(d, "e0.parquet"))
    # epoch 1: click @200s (chain still incomplete)
    pq.write_table(pa.table({
        "ts": pa.array([200 * US], pa.timestamp("us")),
        "user_id": pa.array([7], pa.int64()),
        "event_id": pa.array([3], pa.int64()),
        "event_type": pa.array(["click"]),
    }), os.path.join(d, "e1.parquet"))
    # epoch 2: purchase @300s completes it; watermark 300s ≥ tail
    pq.write_table(pa.table({
        "ts": pa.array([300 * US], pa.timestamp("us")),
        "user_id": pa.array([7], pa.int64()),
        "event_id": pa.array([4], pa.int64()),
        "event_type": pa.array(["purchase"]),
    }), os.path.join(d, "e2.parquet"))
    # epoch 3: unrelated noise long after
    pq.write_table(pa.table({
        "ts": pa.array([9000 * US], pa.timestamp("us")),
        "user_id": pa.array([8], pa.int64()),
        "event_id": pa.array([5], pa.int64()),
        "event_type": pa.array(["view"]),
    }), os.path.join(d, "e3.parquet"))
    out = str(tmp_path / "out")
    m = run_followed_by_stream(d, out, pattern=PATTERN,
                               within_us=3600 * US, partitions=2,
                               files_per_epoch=1)
    got = _stream_result(out)
    assert len(got) == 1
    assert (got.iloc[0]["first_event_id"], got.iloc[0]["last_event_id"],
            got.iloc[0]["span_us"]) == (1, 4, 200 * US)
    assert m["worker_metrics"]["matches_emitted"] == 1
    # eager: the match lands in epoch 2 (watermark passes the tail),
    # not epoch 3 (the start's timeout horizon)
    sink = ExactlyOnceParquetSink(out)
    by_epoch = [rec["epoch"] for rec in sink.lineage() if rec["rows"]]
    assert set(by_epoch) == {2}


def test_followed_by_stream_rerun_and_pause_resume(events_dir, tmp_path):
    kw = dict(pattern=PATTERN, within_us=WITHIN_US, partitions=4,
              files_per_epoch=1)
    out = str(tmp_path / "resume")
    run_followed_by_stream(events_dir, out, **kw)
    got1 = _stream_result(out)
    m2 = run_followed_by_stream(events_dir, out, **kw)
    assert m2["partitions_written"] == 0
    pd.testing.assert_frame_equal(_stream_result(out), got1)

    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    half = str(tmp_path / "half")
    os.makedirs(half)
    for f in files[:2]:
        shutil.copy(f, half)
    out2 = str(tmp_path / "inc")
    run_followed_by_stream(half, out2, drain=False, **kw)
    for f in files[2:]:
        shutil.copy(f, half)
    m3 = run_followed_by_stream(half, out2, **kw)
    assert m3["start_epoch"] == 2
    pd.testing.assert_frame_equal(_stream_result(out2),
                                  _batch_truth(events_dir))
