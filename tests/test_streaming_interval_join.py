"""Streaming interval join (IntervalJoinWorker / run_interval_join_stream)
vs the batch operator and the exactly-once/resume machinery."""

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.streaming import ExactlyOnceParquetSink
from bento_ray.streaming.engine import run_interval_join_stream

LOWER_US = 1
UPPER_US = 7_200_000_000  # 2h, matches q_interval_join


@pytest.fixture(scope="module")
def streams_dir(tmp_path_factory):
    """Split sf0.001 events into a click stream and a purchase stream,
    each as 4 time-ordered files (the stream's arrival order)."""
    root = tmp_path_factory.mktemp("ij_stream")
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

    from bento_ray.stages.join import interval_join

    clicks = rd.read_parquet(
        sorted(glob.glob(os.path.join(streams_dir["left"], "*.parquet"))))
    buys = rd.read_parquet(
        sorted(glob.glob(os.path.join(streams_dir["right"], "*.parquet"))))
    out = interval_join(
        clicks, buys, key_col="user_id", left_ts="ts", right_ts="ts",
        left_id_col="event_id", right_id_col="event_id",
        left_out="left_id", right_out="right_id",
        lower_us=LOWER_US, upper_us=UPPER_US).to_pandas()
    out = out.rename(columns={"user_id": "key"})
    return out[["key", "left_id", "right_id", "lag_us"]] \
        .sort_values(["key", "left_id", "right_id"]).reset_index(drop=True)


def _stream_result(out_dir) -> pd.DataFrame:
    df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
    return df[["key", "left_id", "right_id", "lag_us"]] \
        .sort_values(["key", "left_id", "right_id"]).reset_index(drop=True)


def test_interval_join_stream_matches_batch_operator(streams_dir, tmp_path):
    out = str(tmp_path / "ij_out")
    m = run_interval_join_stream(
        streams_dir["left"], streams_dir["right"], out,
        key_col="user_id", lower_us=LOWER_US, upper_us=UPPER_US,
        partitions=4, files_per_epoch=1)
    got = _stream_result(out)
    want = _batch_truth(streams_dir)
    pd.testing.assert_frame_equal(got, want)
    assert m["worker_metrics"]["pairs_emitted"] == len(want)


def test_interval_join_stream_boundary_pair_emits_once(tmp_path):
    """A pair whose members arrive in different epochs emits exactly
    once, at the flush whose watermark passes the later timestamp."""
    US = 1_000_000
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ld), os.makedirs(rd_)
    # left stream: click at 100s (epoch 0), a dummy late click at 400s
    # (epoch 1) that advances the left frontier past the pair
    pq.write_table(pa.table({
        "ts": pa.array([100 * US], pa.timestamp("us")),
        "user_id": pa.array([7], pa.int64()),
        "event_id": pa.array([1], pa.int64()),
    }), os.path.join(ld, "l0.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([400 * US], pa.timestamp("us")),
        "user_id": pa.array([8], pa.int64()),
        "event_id": pa.array([3], pa.int64()),
    }), os.path.join(ld, "l1.parquet"))
    # right stream: purchase at 150s arrives only in epoch 1
    pq.write_table(pa.table({
        "ts": pa.array([90 * US], pa.timestamp("us")),
        "user_id": pa.array([9], pa.int64()),
        "event_id": pa.array([4], pa.int64()),
    }), os.path.join(rd_, "r0.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([150 * US], pa.timestamp("us")),
        "user_id": pa.array([7], pa.int64()),
        "event_id": pa.array([2], pa.int64()),
    }), os.path.join(rd_, "r1.parquet"))
    out = str(tmp_path / "out")
    m = run_interval_join_stream(
        ld, rd_, out, key_col="user_id",
        lower_us=LOWER_US, upper_us=UPPER_US,
        partitions=2, files_per_epoch=1)
    got = _stream_result(out)
    assert len(got) == 1
    assert (got.iloc[0]["left_id"], got.iloc[0]["right_id"],
            got.iloc[0]["lag_us"]) == (1, 2, 50 * US)
    assert m["worker_metrics"]["pairs_emitted"] == 1


def test_interval_join_stream_negative_bounds(tmp_path):
    """lower_us < 0: rights BEFORE the left qualify; right-side
    retention must hold rows until watermark > ts - lower."""
    US = 1_000_000
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ld), os.makedirs(rd_)
    # right (purchase) at 100s arrives first; left (click) at 160s
    # arrives an epoch later — pair valid for lag in [-120s, 0)
    pq.write_table(pa.table({
        "ts": pa.array([100 * US], pa.timestamp("us")),
        "user_id": pa.array([5], pa.int64()),
        "event_id": pa.array([11], pa.int64()),
    }), os.path.join(rd_, "r0.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([200 * US], pa.timestamp("us")),
        "user_id": pa.array([6], pa.int64()),
        "event_id": pa.array([12], pa.int64()),
    }), os.path.join(rd_, "r1.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([90 * US], pa.timestamp("us")),
        "user_id": pa.array([4], pa.int64()),
        "event_id": pa.array([13], pa.int64()),
    }), os.path.join(ld, "l0.parquet"))
    pq.write_table(pa.table({
        "ts": pa.array([160 * US], pa.timestamp("us")),
        "user_id": pa.array([5], pa.int64()),
        "event_id": pa.array([14], pa.int64()),
    }), os.path.join(ld, "l1.parquet"))
    out = str(tmp_path / "out")
    run_interval_join_stream(
        ld, rd_, out, key_col="user_id",
        lower_us=-120 * US, upper_us=0,
        partitions=2, files_per_epoch=1)
    got = _stream_result(out)
    assert len(got) == 1
    assert (got.iloc[0]["left_id"], got.iloc[0]["right_id"],
            got.iloc[0]["lag_us"]) == (14, 11, -60 * US)


def test_interval_join_stream_rerun_skips_done_epochs(streams_dir, tmp_path):
    out = str(tmp_path / "ij_resume")
    kw = dict(key_col="user_id", lower_us=LOWER_US, upper_us=UPPER_US,
              partitions=4, files_per_epoch=1)
    run_interval_join_stream(streams_dir["left"], streams_dir["right"],
                             out, **kw)
    got1 = _stream_result(out)
    m2 = run_interval_join_stream(streams_dir["left"],
                                  streams_dir["right"], out, **kw)
    assert m2["partitions_written"] == 0
    pd.testing.assert_frame_equal(_stream_result(out), got1)


def test_interval_join_stream_incremental_files_resume(streams_dir,
                                                       tmp_path):
    """Process the first half of both streams, then the full streams:
    the second run restores worker state from the snapshot and only
    runs the new epochs — results identical to one continuous run."""
    half = {s: str(tmp_path / f"half_{s}") for s in ("left", "right")}
    files = {s: sorted(glob.glob(os.path.join(streams_dir[s],
                                              "*.parquet")))
             for s in ("left", "right")}
    for s in ("left", "right"):
        os.makedirs(half[s])
        for f in files[s][:2]:
            shutil.copy(f, half[s])
    out = str(tmp_path / "out_inc")
    kw = dict(key_col="user_id", lower_us=LOWER_US, upper_us=UPPER_US,
              partitions=4, files_per_epoch=1)
    # drain=False = pause (not end-of-stream): no frontier jump, so the
    # appended files are on time and boundary-crossing pairs still form
    run_interval_join_stream(half["left"], half["right"], out,
                             drain=False, **kw)
    for s in ("left", "right"):
        for f in files[s][2:]:
            shutil.copy(f, half[s])
    m2 = run_interval_join_stream(half["left"], half["right"], out, **kw)
    assert m2["start_epoch"] == 2
    got = _stream_result(out)
    want = _batch_truth(streams_dir)
    pd.testing.assert_frame_equal(got, want)


def test_interval_join_stream_crash_replays_only_unacked(streams_dir,
                                                         tmp_path):
    """Crash after 2 of 4 partitions of epoch 1 committed → resume
    restores the epoch-0 snapshot, replays epoch 1, skips exactly the
    committed partitions (idempotent sink), and the final output is
    identical to a clean run."""
    kw = dict(key_col="user_id", lower_us=LOWER_US, upper_us=UPPER_US,
              partitions=4, files_per_epoch=1)
    clean_out = str(tmp_path / "clean")
    run_interval_join_stream(streams_dir["left"], streams_dir["right"],
                             clean_out, **kw)
    clean = _stream_result(clean_out)

    out = str(tmp_path / "crash")
    # crash_after is the engine's deterministic fault-injection hook —
    # commits run in parallel off-driver, so a driver-side monkeypatch
    # of write_partition would never fire in the commit tasks
    with pytest.raises(RuntimeError, match="injected crash"):
        run_interval_join_stream(streams_dir["left"],
                                 streams_dir["right"], out,
                                 crash_after=(1, 2), **kw)

    sink = ExactlyOnceParquetSink(out)
    assert sink.last_done_epoch() == 0
    assert not sink.committed(1, 2)
    # commits are parallel: the non-injected partitions of epoch 1 may
    # or may not have landed before the failure surfaced
    pre_committed = sum(sink.committed(1, p) for p in (0, 1, 3))

    m = run_interval_join_stream(streams_dir["left"],
                                 streams_dir["right"], out, **kw)
    assert m["start_epoch"] == 1
    assert m["partitions_skipped"] == pre_committed
    pd.testing.assert_frame_equal(_stream_result(out), clean)


def _one_event_file(path, ts_s, user, eid):
    US = 1_000_000
    pq.write_table(pa.table({
        "ts": pa.array([ts_s * US], pa.timestamp("us")),
        "user_id": pa.array([user], pa.int64()),
        "event_id": pa.array([eid], pa.int64()),
    }), path)


def test_two_stream_watermark_survives_completion_order(tmp_path,
                                                        monkeypatch):
    """Regression (ADVICE r4, high): _submit_in_waves yields results in
    COMPLETION order once the in-flight window fills, so per-side
    event-time frontiers must be folded from the side tag each feeder
    returns — zipping against the submission list misattributes them
    and min(gmax) can jump past the lagging stream (here: to 490s
    instead of 20s), late-dropping the right member of a real pair.
    Simulate the reordering deterministically by rotating every wave's
    results; the output must be unaffected."""
    from bento_ray.streaming import engine as eng

    real = eng._submit_in_waves

    def rotated(submit, items, max_inflight=None):
        res = real(submit, items, max_inflight)
        return res[1:] + res[:1] if len(res) > 1 else res

    monkeypatch.setattr(eng, "_submit_in_waves", rotated)

    ld, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ld), os.makedirs(rdir)
    # epoch 0 (files_per_epoch=2): left frontier 1000s, right 20s
    _one_event_file(os.path.join(ld, "l0.parquet"), 470, 7, 1)   # the click
    _one_event_file(os.path.join(ld, "l1.parquet"), 1000, 99, 2)
    _one_event_file(os.path.join(rdir, "r0.parquet"), 10, 98, 3)
    _one_event_file(os.path.join(rdir, "r1.parquet"), 20, 97, 4)
    # epoch 1: the matching purchase @480s — on time vs the true
    # watermark (20s), late vs the misattributed one (490s)
    _one_event_file(os.path.join(ld, "l2.parquet"), 1001, 96, 5)
    _one_event_file(os.path.join(ld, "l3.parquet"), 1002, 95, 6)
    _one_event_file(os.path.join(rdir, "r2.parquet"), 480, 7, 7)
    _one_event_file(os.path.join(rdir, "r3.parquet"), 481, 94, 8)

    out = str(tmp_path / "out")
    m = run_interval_join_stream(
        ld, rdir, out, key_col="user_id",
        lower_us=LOWER_US, upper_us=UPPER_US,
        partitions=2, files_per_epoch=2)
    got = _stream_result(out)
    assert m["worker_metrics"]["late_dropped"] == 0
    assert len(got) == 1
    assert (got.iloc[0]["left_id"], got.iloc[0]["right_id"],
            got.iloc[0]["lag_us"]) == (1, 7, 10 * 1_000_000)


def test_two_stream_pause_append_resume_misaligned(streams_dir, tmp_path):
    """Regression (ADVICE r4, medium): pause with a per-side file count
    NOT a multiple of files_per_epoch (3 of 4 files, fpe=2), then
    append the 4th and resume — naive re-chunking of the grown listing
    would place the appended file inside the already-committed epoch 1
    and silently never feed it. The lineage-based re-chunk feeds it as
    epoch 2 and the result matches the batch operator."""
    grow_l = str(tmp_path / "gl")
    grow_r = str(tmp_path / "gr")
    os.makedirs(grow_l), os.makedirs(grow_r)
    lf = sorted(glob.glob(os.path.join(streams_dir["left"], "*.parquet")))
    rf = sorted(glob.glob(os.path.join(streams_dir["right"], "*.parquet")))
    for f in lf[:3]:
        shutil.copy(f, grow_l)
    for f in rf[:3]:
        shutil.copy(f, grow_r)
    out = str(tmp_path / "out")
    kw = dict(key_col="user_id", lower_us=LOWER_US, upper_us=UPPER_US,
              partitions=4, files_per_epoch=2)
    m1 = run_interval_join_stream(grow_l, grow_r, out, drain=False, **kw)
    assert m1["epochs"] == 2                     # [f0,f1], [f2]
    shutil.copy(lf[3], grow_l)
    shutil.copy(rf[3], grow_r)
    m2 = run_interval_join_stream(grow_l, grow_r, out, resume=True, **kw)
    assert m2["start_epoch"] == 2 and m2["epochs"] == 3
    pd.testing.assert_frame_equal(_stream_result(out),
                                  _batch_truth(streams_dir))


def test_url_keyed_stream_matches_brute_force(tmp_path):
    """url_key=True: the join key is the stable hash of the CANONICAL
    url — messy variants (www./case/port/utm/trailing-slash) of the
    same landing page must unify across the two streams, and the
    streamed pair set must equal the brute-force truth."""
    import numpy as np

    from bento_ray.testgen.events import ensure_url_event_streams
    from bento_ray.textops.urlops import canonicalize_batch
    from bento_ray.util import stable_hash

    lo, up = 0, 60_000_000
    l, r = ensure_url_event_streams(
        3000, seed=5, files=6,
        cache_root=str(tmp_path / "gen"))
    out = str(tmp_path / "out")
    m = run_interval_join_stream(
        l, r, out, key_col="url", url_key=True, lower_us=lo, upper_us=up,
        partitions=3, files_per_epoch=2)

    frames = []
    for side, d in ((0, l), (1, r)):
        t = pq.read_table(d)
        df = pd.DataFrame({
            "ts": t.column("ts").cast(pa.int64()).to_numpy(),
            "eid": t.column("event_id").to_numpy(),
            "key": stable_hash(
                canonicalize_batch(t.column("url"))).astype(np.int64),
        })
        frames.append(df)
    left, right = frames
    # canonicalization must actually unify variants: far fewer keys
    # than raw url strings
    raw = pq.read_table(l).column("url").to_pandas().nunique()
    assert left["key"].nunique() < raw / 2
    truth = left.merge(right, on="key", suffixes=("_l", "_r"))
    truth = truth[(truth["ts_r"] - truth["ts_l"] >= lo)
                  & (truth["ts_r"] - truth["ts_l"] <= up)]
    expect = set(zip(truth["eid_l"], truth["eid_r"]))

    got_df = ExactlyOnceParquetSink(out).read().to_pandas()
    got = set(zip(got_df["left_id"], got_df["right_id"]))
    assert m["worker_metrics"]["pairs_emitted"] == len(got_df)
    assert got == expect
