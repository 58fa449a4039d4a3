"""Streaming CEP absence/timeout (AbsenceWorker / run_absence_stream)
vs the batch operator and the watermark-timer semantics."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.streaming import ExactlyOnceParquetSink
from bento_ray.streaming.engine import run_absence_stream

WITHIN_US = 6 * 3_600_000_000  # 6h, matches q_cep_absence


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("abs_stream"))
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

    from bento_ray.stages.cep import match_absence

    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    ds = rd.read_parquet(files)
    out = match_absence(ds, "click", "purchase", within_us=WITHIN_US,
                        key_col="user_id").to_pandas()
    out = out.rename(columns={"user_id": "key"})
    return out[["key", "first_event_id"]] \
        .sort_values(["key", "first_event_id"]).reset_index(drop=True)


def _stream_result(out_dir) -> pd.DataFrame:
    df = ExactlyOnceParquetSink(out_dir).read().to_pandas()
    return df[["key", "first_event_id"]] \
        .sort_values(["key", "first_event_id"]).reset_index(drop=True)


def test_absence_stream_matches_batch_operator(events_dir, tmp_path):
    out = str(tmp_path / "abs_out")
    m = run_absence_stream(events_dir, out, first="click",
                           absent="purchase", within_us=WITHIN_US,
                           partitions=4, files_per_epoch=1)
    assert m["rows_fed"] == 1000
    got = _stream_result(out)
    want = _batch_truth(events_dir)
    pd.testing.assert_frame_equal(got, want)
    assert m["worker_metrics"]["alerts_emitted"] == len(want)


def test_absence_alert_fires_at_timeout_not_before(tmp_path):
    """The alert for a click with no purchase emits only once the
    watermark passes ts + within; a purchase arriving in a later epoch
    but inside the bound suppresses it."""
    US = 1_000_000
    d = str(tmp_path / "in")
    os.makedirs(d)
    # epoch 0: clicks for users 1 and 2 at t=100s
    pq.write_table(pa.table({
        "ts": pa.array([100 * US, 100 * US], pa.timestamp("us")),
        "user_id": pa.array([1, 2], pa.int64()),
        "event_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["click", "click"]),
    }), os.path.join(d, "e0.parquet"))
    # epoch 1 (still inside user-1's bound): purchase for user 1 only
    pq.write_table(pa.table({
        "ts": pa.array([150 * US], pa.timestamp("us")),
        "user_id": pa.array([1], pa.int64()),
        "event_id": pa.array([11], pa.int64()),
        "event_type": pa.array(["purchase"]),
    }), os.path.join(d, "e1.parquet"))
    # epoch 2: unrelated event far past both timeouts
    pq.write_table(pa.table({
        "ts": pa.array([400 * US], pa.timestamp("us")),
        "user_id": pa.array([3], pa.int64()),
        "event_id": pa.array([30], pa.int64()),
        "event_type": pa.array(["view"]),
    }), os.path.join(d, "e2.parquet"))
    out = str(tmp_path / "out")
    m = run_absence_stream(d, out, first="click", absent="purchase",
                           within_us=120 * US, partitions=2,
                           files_per_epoch=1)
    got = _stream_result(out)
    # only user 2's click times out; user 1 was suppressed cross-epoch
    assert len(got) == 1
    assert (got.iloc[0]["key"], got.iloc[0]["first_event_id"]) == (2, 20)
    assert m["worker_metrics"]["alerts_emitted"] == 1
    # the alert must land in epoch 2's output (watermark 400s passes
    # 100s+120s), not epoch 1's (150s < 220s)
    sink = ExactlyOnceParquetSink(out)
    by_epoch = [rec["epoch"] for rec in sink.lineage() if rec["rows"]]
    assert set(by_epoch) == {2}


def test_absence_stream_rerun_and_pause_resume(events_dir, tmp_path):
    kw = dict(first="click", absent="purchase", within_us=WITHIN_US,
              partitions=4, files_per_epoch=1)
    out = str(tmp_path / "resume")
    run_absence_stream(events_dir, out, **kw)
    got1 = _stream_result(out)
    m2 = run_absence_stream(events_dir, out, **kw)
    assert m2["partitions_written"] == 0
    pd.testing.assert_frame_equal(_stream_result(out), got1)

    # pause after half the files, append the rest, resume → parity
    import shutil

    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    half = str(tmp_path / "half")
    os.makedirs(half)
    for f in files[:2]:
        shutil.copy(f, half)
    out2 = str(tmp_path / "inc")
    run_absence_stream(half, out2, drain=False, **kw)
    for f in files[2:]:
        shutil.copy(f, half)
    m3 = run_absence_stream(half, out2, **kw)
    assert m3["start_epoch"] == 2
    pd.testing.assert_frame_equal(_stream_result(out2),
                                  _batch_truth(events_dir))
