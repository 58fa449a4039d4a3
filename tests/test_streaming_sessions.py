"""Streaming session windows + streaming sliding windows vs independent
oracles."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.streaming import ExactlyOnceParquetSink, StreamConfig, run_stream
from bento_ray.streaming.engine import run_session_stream
from bento_ray.testgen.pages import BASE_TS_US

GAP_US = 30 * 60 * 1_000_000  # 30 min


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """events split into multiple ts-ordered files (epoch units)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["ts", "user_id", "event_id", "value"])
    df = t.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    n = len(df)
    for i in range(4):
        part = df.iloc[i * n // 4:(i + 1) * n // 4]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       os.path.join(d, f"events-{i:02d}.parquet"))
    return d


def _session_oracle(events_dir) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    df = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    out = []
    for uid, g in df.groupby("user_id"):
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = g["value"].to_numpy()
        brk = np.ones(len(ts), bool)
        brk[1:] = (ts[1:] - ts[:-1]) > GAP_US
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            m = sid == s
            out.append((uid, ts[m].min(), ts[m].max(), int(m.sum()),
                        round(float(vals[m].sum()), 4)))
    odf = pd.DataFrame(out, columns=["key", "session_start", "session_end",
                                     "n_events", "sum_value"])
    odf["session_start"] = pd.to_datetime(odf["session_start"], unit="us")
    odf["session_end"] = pd.to_datetime(odf["session_end"], unit="us")
    return odf.sort_values(["key", "session_start"]).reset_index(drop=True)


def test_streaming_sessions_match_oracle(events_dir, tmp_path):
    out = str(tmp_path / "sess_out")
    m = run_session_stream(events_dir, out, key_col="user_id", ts_col="ts",
                           value_col="value", gap_us=GAP_US, partitions=4,
                           files_per_epoch=1)
    assert m["rows_fed"] == 1000
    got = ExactlyOnceParquetSink(out).read().to_pandas()
    got["session_start"] = pd.to_datetime(got["session_start"]).astype(
        "datetime64[ns]")
    got["session_end"] = pd.to_datetime(got["session_end"]).astype(
        "datetime64[ns]")
    got = got.sort_values(["key", "session_start"]).reset_index(drop=True)
    want = _session_oracle(events_dir)
    pd.testing.assert_frame_equal(
        got[["key", "session_start", "session_end", "n_events", "sum_value"]],
        want)


def test_streaming_sessions_resume(events_dir, tmp_path):
    out1 = str(tmp_path / "a")
    run_session_stream(events_dir, out1, key_col="user_id", ts_col="ts",
                       value_col="value", gap_us=GAP_US, partitions=2,
                       files_per_epoch=1)
    clean = ExactlyOnceParquetSink(out1).read().to_pandas() \
        .sort_values(["key", "session_start"]).reset_index(drop=True)

    # run only epochs 0..1 by limiting files, then resume on full input
    out2 = str(tmp_path / "b")
    part_dir = str(tmp_path / "partial")
    os.makedirs(part_dir)
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    for f in files[:2]:
        shutil.copy(f, part_dir)
    run_session_stream(part_dir, out2, key_col="user_id", ts_col="ts",
                       value_col="value", gap_us=GAP_US, partitions=2,
                       files_per_epoch=1)
    for f in files[2:]:
        shutil.copy(f, part_dir)
    m = run_session_stream(part_dir, out2, key_col="user_id", ts_col="ts",
                           value_col="value", gap_us=GAP_US, partitions=2,
                           files_per_epoch=1, resume=True)
    assert m["start_epoch"] == 2
    got = ExactlyOnceParquetSink(out2).read().to_pandas() \
        .sort_values(["key", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, clean)


def test_streaming_sliding_windows(pages_small, tmp_path):
    """Streaming sliding windows (size=10s slide=5s) match the batch
    assigner's pane counts."""
    from bento_ray.pipelines.flagship import dim_versions_table
    from bento_ray.stages.window import assign_sliding

    out = str(tmp_path / "slide")
    cfg = StreamConfig(window_size_us=10_000_000, slide_us=5_000_000,
                       allowed_lateness_us=2_000_000, partitions=4,
                       out_partitions=4, files_per_epoch=2)
    run_stream(pages_small, cfg, out, dim_versions=None)
    got = ExactlyOnceParquetSink(out).read().to_pandas()
    got["window_end"] = pd.to_datetime(got["window_end"], utc=True).astype(
        "datetime64[us, UTC]")
    got = (got.groupby(["window_end", "lang"])[["pages", "nbytes"]].sum()
           .reset_index().sort_values(["window_end", "lang"])
           .reset_index(drop=True))

    # oracle: dedupe first-crawl, assign sliding panes, aggregate
    import pyarrow.compute as pc

    from bento_ray.html import strip_html

    files = sorted(glob.glob(os.path.join(pages_small, "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    df = t.to_pandas()
    df["nbytes"] = [len(strip_html(h).encode()) for h in df["html"]]
    df["ts_us"] = df["warc_ts"].astype("datetime64[us, UTC]").astype("int64")
    df = df.sort_values(["ts_us", "url"], kind="stable").drop_duplicates(
        subset=["url"], keep="first")
    tt = pa.Table.from_pandas(df[["ts_us", "lang", "nbytes"]].rename(
        columns={"ts_us": "warc_ts"}), preserve_index=False)
    tt = tt.set_column(0, "warc_ts",
                       tt.column("warc_ts").cast(pa.timestamp("us", tz="UTC")))
    assigned = assign_sliding(tt, "warc_ts", 10_000_000, 5_000_000).to_pandas()
    assigned["window_end"] = pd.to_datetime(assigned["window_end"], utc=True) \
        .astype("datetime64[us, UTC]")
    want = (assigned.groupby(["window_end", "lang"])
            .agg(pages=("nbytes", "size"), nbytes=("nbytes", "sum"))
            .reset_index().sort_values(["window_end", "lang"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_streaming_dedupe_ttl(tmp_path):
    """dedupe_ttl_us: a url re-seen after the TTL horizon is NOT
    deduplicated (the reference's TTL'd memory cache)."""
    import pyarrow.parquet as pq

    d = str(tmp_path / "ttl_in")
    os.makedirs(d)
    base = BASE_TS_US

    def mk(path, rows):
        t = pa.table({
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([base + r[1] for r in rows],
                                pa.timestamp("us", tz="UTC")),
            "html": pa.array([b"<p>x</p>"] * len(rows), pa.binary()),
            "lang": pa.array(["en"] * len(rows)),
        })
        pq.write_table(t, path)

    # same url at t=1s and t=200s; TTL=60s → both kept
    mk(os.path.join(d, "a.parquet"), [("u", 1_000_000), ("x", 2_000_000)])
    mk(os.path.join(d, "b.parquet"), [("u", 200_000_000), ("y", 201_000_000)])
    cfg = StreamConfig(partitions=2, out_partitions=2, files_per_epoch=1,
                       allowed_lateness_us=0, dedupe_ttl_us=60_000_000,
                       window_size_us=10_000_000)
    m = run_stream(d, cfg, str(tmp_path / "ttl_out"), dim_versions=None)
    assert m["worker_metrics"]["dedupe_dropped"] == 0
    df = ExactlyOnceParquetSink(str(tmp_path / "ttl_out")).read().to_pandas()
    assert int(df["pages"].sum()) == 4

    # control: without TTL the repeat is dropped
    m2 = run_stream(d, StreamConfig(partitions=2, out_partitions=2,
                                    files_per_epoch=1, allowed_lateness_us=0,
                                    window_size_us=10_000_000),
                    str(tmp_path / "nottl_out"), dim_versions=None)
    assert m2["worker_metrics"]["dedupe_dropped"] == 1


def test_streaming_window_offset(pages_small, tmp_path):
    """offset_us shifts the UTC-epoch alignment: window ends land on
    offset + k*size."""
    out = str(tmp_path / "off")
    cfg = StreamConfig(window_size_us=10_000_000, offset_us=3_000_000,
                       allowed_lateness_us=2_000_000, partitions=2,
                       out_partitions=2, files_per_epoch=3)
    run_stream(pages_small, cfg, out, dim_versions=None)
    df = ExactlyOnceParquetSink(out).read().to_pandas()
    ends = pd.to_datetime(df["window_end"], utc=True).astype(
        "datetime64[us, UTC]").astype("int64")
    assert ((ends - 3_000_000) % 10_000_000 == 0).all()
    assert len(df) > 0


def test_session_worker_out_of_order_across_flushes():
    """An out-of-order event arriving in a later flush that falls inside
    a still-open session's gap merges into it (no spurious session), and
    sessions close only when the watermark passes last+gap (ADVICE r1)."""
    import ray

    from bento_ray.streaming.actors import SessionWorker

    w = SessionWorker.remote(0, 10_000_000)  # gap 10s
    s = 1_000_000
    # flush 1: events at t=0s and t=30s for key A — gap exceeded within
    # the flush, but watermark (20s) has NOT passed 0s+gap... it has
    # (0+10 <= 20): first session closes; second (30s) stays open.
    ray.get(w.ingest.remote(np.array([0, 30 * s]),
                            np.array(["A", "A"], object),
                            np.array([1.0, 2.0])))
    t1 = ray.get(w.flush.remote(20 * s))
    assert t1.num_rows == 1
    assert t1.column("session_end").cast(pa.int64()).to_pylist() == [0]
    # flush 2: out-of-order event at 25s — within gap of the OPEN 30s
    # session → merges (session [25,30]), NOT a spurious new session.
    ray.get(w.ingest.remote(np.array([25 * s]), np.array(["A"], object),
                            np.array([4.0])))
    t2 = ray.get(w.flush.remote(50 * s))
    assert t2.num_rows == 1
    assert t2.column("session_start").cast(pa.int64()).to_pylist() == [25 * s]
    assert t2.column("n_events").to_pylist() == [2]
    assert t2.column("sum_value").to_pylist() == [6.0]


def test_session_worker_late_drop_counted():
    """Events at or before the last flush watermark are dropped and
    counted — the frontier rule that keeps replay deterministic."""
    import ray

    from bento_ray.streaming.actors import SessionWorker

    w = SessionWorker.remote(0, 10_000_000)
    s = 1_000_000
    ray.get(w.ingest.remote(np.array([100 * s]), np.array(["A"], object),
                            np.array([1.0])))
    ray.get(w.flush.remote(60 * s))
    # late: 59s <= frontier(60s) → dropped; 61s is accepted
    ray.get(w.ingest.remote(np.array([59 * s, 61 * s]),
                            np.array(["B", "C"], object),
                            np.array([1.0, 1.0])))
    t = ray.get(w.flush.remote(200 * s))
    m = ray.get(w.get_metrics.remote())
    assert m["late_dropped"] == 1
    assert sorted(t.column("key").to_pylist()) == ["A", "C"]


def test_session_worker_bridge_merges_two_sessions():
    """A bridging event merges two open sessions into one."""
    import ray

    from bento_ray.streaming.actors import SessionWorker

    w = SessionWorker.remote(0, 10_000_000)
    s = 1_000_000
    ray.get(w.ingest.remote(np.array([0, 15 * s]),
                            np.array(["A", "A"], object),
                            np.array([1.0, 2.0])))
    ray.get(w.flush.remote(5 * s))  # nothing closes (0+10 > 5)
    # 8s bridges [0,0] and [15,15] (8-0<=10, 15-8<=10) → one session
    ray.get(w.ingest.remote(np.array([8 * s]), np.array(["A"], object),
                            np.array([4.0])))
    t = ray.get(w.flush.remote(60 * s))
    assert t.num_rows == 1
    assert t.column("n_events").to_pylist() == [3]
    assert t.column("session_start").cast(pa.int64()).to_pylist() == [0]
    assert t.column("session_end").cast(pa.int64()).to_pylist() == [15 * s]
