"""Streaming CEP (CepWorker / run_cep_stream) vs the batch operator
and the exactly-once/resume machinery."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.streaming import ExactlyOnceParquetSink
from bento_ray.streaming.engine import run_cep_stream

WITHIN_US = 6 * 3_600_000_000  # 6h, matches q_cep_sequence


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cep_stream"))
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

    from bento_ray.stages.cep import match_event_sequence

    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    ds = rd.read_parquet(files)
    out = match_event_sequence(ds, ["click", "purchase"],
                               within_us=WITHIN_US,
                               key_col="user_id").to_pandas()
    return out.sort_values(["user_id", "first_event_id"]) \
        .reset_index(drop=True)


def _stream_result(out_dir) -> pd.DataFrame:
    df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
    df = df.rename(columns={"key": "user_id"})
    return df[["user_id", "first_event_id", "last_event_id", "span_us"]] \
        .sort_values(["user_id", "first_event_id"]).reset_index(drop=True)


def test_cep_stream_matches_batch_operator(events_dir, tmp_path):
    out = str(tmp_path / "cep_out")
    m = run_cep_stream(events_dir, out, pattern=["click", "purchase"],
                       within_us=WITHIN_US, partitions=4,
                       files_per_epoch=1)
    assert m["rows_fed"] == 1000
    got = _stream_result(out)
    want = _batch_truth(events_dir)
    pd.testing.assert_frame_equal(got, want)
    # matches emitted exactly once across all epochs
    assert m["worker_metrics"]["matches_emitted"] == len(want)


def test_cep_stream_boundary_match_emits_once(tmp_path):
    """A match split across epochs emits exactly once, in the epoch
    whose watermark passes its tail."""
    US = 1_000_000
    d = str(tmp_path / "in")
    os.makedirs(d)
    # epoch 0: click at t=100s (watermark 100s — pair incomplete)
    pq.write_table(pa.table({
        "ts": pa.array([100 * US], pa.timestamp("us")),
        "user_id": pa.array([7], pa.int64()),
        "event_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["click"]),
    }), os.path.join(d, "e0.parquet"))
    # epoch 1: purchase at t=150s completes it
    pq.write_table(pa.table({
        "ts": pa.array([150 * US], pa.timestamp("us")),
        "user_id": pa.array([7], pa.int64()),
        "event_id": pa.array([2], pa.int64()),
        "event_type": pa.array(["purchase"]),
    }), os.path.join(d, "e1.parquet"))
    out = str(tmp_path / "out")
    m = run_cep_stream(d, out, pattern=["click", "purchase"],
                       within_us=WITHIN_US, partitions=2,
                       files_per_epoch=1)
    got = _stream_result(out)
    assert len(got) == 1
    assert (got.iloc[0]["first_event_id"], got.iloc[0]["last_event_id"],
            got.iloc[0]["span_us"]) == (1, 2, 50 * US)
    assert m["worker_metrics"]["matches_emitted"] == 1


def test_cep_stream_resume_skips_done_epochs(events_dir, tmp_path):
    out = str(tmp_path / "cep_resume")
    m1 = run_cep_stream(events_dir, out, pattern=["click", "purchase"],
                        within_us=WITHIN_US, partitions=4,
                        files_per_epoch=1)
    got1 = _stream_result(out)
    # re-run over the same sink: every epoch already committed
    m2 = run_cep_stream(events_dir, out, pattern=["click", "purchase"],
                        within_us=WITHIN_US, partitions=4,
                        files_per_epoch=1)
    assert m2["partitions_written"] == 0
    pd.testing.assert_frame_equal(_stream_result(out), got1)


def test_cep_stream_incremental_files_resume(events_dir, tmp_path):
    """Process the first half, then the full dir: the second run
    restores worker state from the snapshot and only runs the new
    epochs — results identical to one continuous run."""
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    half = str(tmp_path / "half")
    os.makedirs(half)
    for f in files[:2]:
        shutil.copy(f, half)
    out = str(tmp_path / "out_inc")
    # drain=False = pause (not end-of-stream): the frontier stays at
    # the normal watermark so the appended files aren't late-dropped
    run_cep_stream(half, out, pattern=["click", "purchase"],
                   within_us=WITHIN_US, partitions=4, files_per_epoch=1,
                   drain=False)
    for f in files[2:]:
        shutil.copy(f, half)
    m2 = run_cep_stream(half, out, pattern=["click", "purchase"],
                        within_us=WITHIN_US, partitions=4,
                        files_per_epoch=1)
    assert m2["start_epoch"] == 2
    got = _stream_result(out)
    want = _batch_truth(events_dir)
    pd.testing.assert_frame_equal(got, want)


def test_typed_feeder_null_event_type(tmp_path):
    """Null event types must survive the dictionary-encoded shuffle
    as None — a NaN dictionary index int16-cast to 0 silently aliased
    nulls onto the alphabetically-first real event type."""
    import ray

    from bento_ray.streaming.engine import _feed_typed_files

    f = str(tmp_path / "ev.parquet")
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us")),
        "event_id": pa.array([10, 11, 12], pa.int64()),
        "event_type": pa.array(["a", None, "b"]),
    }), f)
    rows, max_ts, refs = ray.get(_feed_typed_files.remote(
        [f], 1, "user_id", "ts", "event_id", "event_type", 65536))
    assert rows == 3
    ts, eid, keys, codes, vocab = ray.get(refs[0])
    order = np.argsort(eid)
    decoded = [vocab[c] for c in codes[order]]
    assert decoded == ["a", None, "b"]
