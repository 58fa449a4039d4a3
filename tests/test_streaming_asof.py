"""Streaming as-of join (AsofJoinWorker / run_asof_join_stream) vs the
batch operator and the exactly-once/resume machinery."""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.streaming import ExactlyOnceParquetSink
from bento_ray.streaming.engine import run_asof_join_stream


@pytest.fixture(scope="module")
def streams_dir(tmp_path_factory):
    """Clicks as the left stream, purchases as the right (dimension)
    stream, each as 4 time-ordered files."""
    root = tmp_path_factory.mktemp("asof_stream")
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["ts", "user_id", "event_id", "event_type"])
    df = t.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    dirs = {}
    for side, etype in (("left", "click"), ("right", "purchase")):
        d = str(root / side)
        os.makedirs(d)
        part = df[df["event_type"] == etype].reset_index(drop=True)
        n = len(part)
        for i in range(4):
            chunk = part.iloc[i * n // 4:(i + 1) * n // 4]
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                os.path.join(d, f"ev-{i:02d}.parquet"))
        dirs[side] = d
    return dirs


def _batch_truth(streams_dir) -> pd.DataFrame:
    import ray.data as rd

    from bento_ray.stages.join import asof_join

    clicks = rd.read_parquet(
        sorted(glob.glob(os.path.join(streams_dir["left"], "*.parquet"))))
    buys = rd.read_parquet(
        sorted(glob.glob(os.path.join(streams_dir["right"], "*.parquet"))))
    out = asof_join(
        clicks, buys, key_col="user_id", left_ts="ts", right_ts="ts",
        left_id_col="event_id", right_id_col="event_id",
        left_out="left_id", right_out="right_id").to_pandas()
    out = out.rename(columns={"user_id": "key"})
    return out[["key", "left_id", "right_id", "right_ts_us", "lag_us"]] \
        .sort_values(["key", "left_id"]).reset_index(drop=True)


def _stream_result(out_dir) -> pd.DataFrame:
    df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
    return df[["key", "left_id", "right_id", "right_ts_us", "lag_us"]] \
        .sort_values(["key", "left_id"]).reset_index(drop=True)


def test_asof_stream_matches_batch_operator(streams_dir, tmp_path):
    out = str(tmp_path / "asof_out")
    m = run_asof_join_stream(
        streams_dir["left"], streams_dir["right"], out,
        key_col="user_id", partitions=4, files_per_epoch=1)
    got = _stream_result(out)
    want = _batch_truth(streams_dir)
    pd.testing.assert_frame_equal(got, want)
    assert m["worker_metrics"]["rows_emitted"] == len(want)


def test_asof_stream_right_state_collapses_behind_watermark(tmp_path):
    """A left row arriving epochs after its as-of right still matches:
    the per-key last right behind the watermark is retained even after
    eviction of everything else at-or-below it."""
    US = 1_000_000
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ld), os.makedirs(rd_)
    # right: two prices for key 5 early on — only the later may be kept
    pq.write_table(pa.table({
        "ts": pa.array([10 * US, 20 * US], pa.timestamp("us")),
        "user_id": pa.array([5, 5], pa.int64()),
        "event_id": pa.array([101, 102], pa.int64()),
    }), os.path.join(rd_, "r0.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([300 * US], pa.timestamp("us")),
        "user_id": pa.array([6], pa.int64()),
        "event_id": pa.array([103], pa.int64()),
    }), os.path.join(rd_, "r1.parquet"))
    # left: a click for key 5 at 250s, two epochs after its right rows
    pq.write_table(pa.table({
        "ts": pa.array([30 * US], pa.timestamp("us")),
        "user_id": pa.array([9], pa.int64()),
        "event_id": pa.array([1], pa.int64()),
    }), os.path.join(ld, "l0.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([250 * US], pa.timestamp("us")),
        "user_id": pa.array([5], pa.int64()),
        "event_id": pa.array([2], pa.int64()),
    }), os.path.join(ld, "l1.parquet"))
    out = str(tmp_path / "out")
    run_asof_join_stream(ld, rd_, out, key_col="user_id",
                         partitions=2, files_per_epoch=1)
    got = _stream_result(out)
    row = got[got["left_id"] == 2].iloc[0]
    assert (row["right_id"], row["right_ts_us"],
            row["lag_us"]) == (102, 20 * US, 230 * US)
    # the key-9 click has no right at all → left-join nulls
    row9 = got[got["left_id"] == 1].iloc[0]
    assert pd.isna(row9["right_id"]) and pd.isna(row9["lag_us"])


def test_asof_stream_tie_takes_largest_right_id(tmp_path):
    US = 1_000_000
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ld), os.makedirs(rd_)
    pq.write_table(pa.table({
        "ts": pa.array([50 * US, 50 * US], pa.timestamp("us")),
        "user_id": pa.array([3, 3], pa.int64()),
        "event_id": pa.array([7, 9], pa.int64()),
    }), os.path.join(rd_, "r0.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([50 * US], pa.timestamp("us")),
        "user_id": pa.array([3], pa.int64()),
        "event_id": pa.array([1], pa.int64()),
    }), os.path.join(ld, "l0.parquet"))
    out = str(tmp_path / "out")
    run_asof_join_stream(ld, rd_, out, key_col="user_id",
                         partitions=2, files_per_epoch=1)
    got = _stream_result(out)
    assert len(got) == 1
    assert got.iloc[0]["right_id"] == 9 and got.iloc[0]["lag_us"] == 0


def test_asof_stream_rerun_and_incremental_resume(streams_dir, tmp_path):
    kw = dict(key_col="user_id", partitions=4, files_per_epoch=1)
    out = str(tmp_path / "resume")
    run_asof_join_stream(streams_dir["left"], streams_dir["right"],
                         out, **kw)
    got1 = _stream_result(out)
    m2 = run_asof_join_stream(streams_dir["left"], streams_dir["right"],
                              out, **kw)
    assert m2["partitions_written"] == 0
    pd.testing.assert_frame_equal(_stream_result(out), got1)

    # incremental: first half, then the rest via snapshot restore
    half = {s: str(tmp_path / f"half_{s}") for s in ("left", "right")}
    files = {s: sorted(glob.glob(os.path.join(streams_dir[s],
                                              "*.parquet")))
             for s in ("left", "right")}
    for s in ("left", "right"):
        os.makedirs(half[s])
        for f in files[s][:2]:
            shutil.copy(f, half[s])
    out2 = str(tmp_path / "inc")
    # drain=False = pause, not end-of-stream: the final flush keeps the
    # normal watermark so later-appended files aren't late-dropped and
    # pending lefts wait for their true as-of rights
    run_asof_join_stream(half["left"], half["right"], out2,
                         drain=False, **kw)
    for s in ("left", "right"):
        for f in files[s][2:]:
            shutil.copy(f, half[s])
    m3 = run_asof_join_stream(half["left"], half["right"], out2, **kw)
    assert m3["start_epoch"] == 2
    pd.testing.assert_frame_equal(_stream_result(out2),
                                  _batch_truth(streams_dir))
