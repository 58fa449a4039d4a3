"""Seeded fuzz: the streaming join workers vs batch truth over many
epochs, with dense keys, timestamp ties, and negative bounds — the
shapes that stress incremental pair enumeration and per-key right-state
collapse."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bento_ray.streaming import ExactlyOnceParquetSink
from bento_ray.streaming.engine import (run_asof_join_stream,
                                        run_interval_join_stream)

US = 1_000_000


def _gen_stream(rng, n, n_keys, t_max_s, id_base):
    ts = np.sort(rng.integers(0, t_max_s, n)) * US  # dense → many ties
    return pd.DataFrame({
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, n_keys, n),
        "event_id": np.arange(id_base, id_base + n, dtype=np.int64),
    })


def _write_files(df, d, n_files):
    os.makedirs(d)
    n = len(df)
    for i in range(n_files):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[i * n // n_files:
                                         (i + 1) * n // n_files],
                                 preserve_index=False),
            os.path.join(d, f"f-{i:02d}.parquet"))


def _brute_interval(ldf, rdf, lo_us, hi_us):
    m = ldf.merge(rdf, on="user_id", suffixes=("_l", "_r"))
    lag = (m["ts_r"].astype("datetime64[us]").astype(np.int64)
           - m["ts_l"].astype("datetime64[us]").astype(np.int64))
    m = m[(lag >= lo_us) & (lag <= hi_us)]
    out = pd.DataFrame({
        "key": m["user_id"].to_numpy(),
        "left_id": m["event_id_l"].to_numpy(),
        "right_id": m["event_id_r"].to_numpy(),
        "lag_us": (m["ts_r"].astype("datetime64[us]").astype(np.int64)
                   - m["ts_l"].astype("datetime64[us]").astype(np.int64)
                   ).to_numpy(),
    })
    return out.sort_values(["key", "left_id", "right_id"]) \
        .reset_index(drop=True)


def _brute_asof(ldf, rdf):
    rows = []
    rr = rdf.assign(ts_us=rdf["ts"].astype("datetime64[us]")
                    .astype(np.int64))
    for _, l in ldf.iterrows():
        lts = np.int64(pd.Timestamp(l["ts"]).value // 1000)
        cand = rr[(rr["user_id"] == l["user_id"]) & (rr["ts_us"] <= lts)]
        if len(cand):
            best = cand.sort_values(["ts_us", "event_id"]).iloc[-1]
            rows.append((l["user_id"], l["event_id"],
                         best["event_id"], best["ts_us"],
                         lts - best["ts_us"]))
        else:
            rows.append((l["user_id"], l["event_id"],
                         None, None, None))
    out = pd.DataFrame(rows, columns=["key", "left_id", "right_id",
                                      "right_ts_us", "lag_us"])
    for c in ("right_id", "right_ts_us", "lag_us"):
        out[c] = out[c].astype("float64")
    return out.sort_values(["key", "left_id"]).reset_index(drop=True)


@pytest.mark.parametrize("seed,lo_s,hi_s", [
    (1, 0, 30),        # non-negative window
    (2, -20, 20),      # straddling zero
    (3, -40, -1),      # strictly negative (rights before lefts)
])
def test_interval_join_stream_fuzz(tmp_path, seed, lo_s, hi_s):
    rng = np.random.default_rng(seed)
    ldf = _gen_stream(rng, 300, 12, 200, 0)
    rdf = _gen_stream(rng, 300, 12, 200, 10_000)
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    _write_files(ldf, ld, 8)
    _write_files(rdf, rd_, 8)
    out = str(tmp_path / "out")
    # dense integer-second data ties at every file boundary; a little
    # lateness keeps those ties on time so brute-force is the truth
    m = run_interval_join_stream(
        ld, rd_, out, key_col="user_id",
        lower_us=lo_s * US, upper_us=hi_s * US,
        allowed_lateness_us=5 * US,
        partitions=3, files_per_epoch=1)      # 8 epochs
    got = ExactlyOnceParquetSink(out).read().to_pandas() \
        [["key", "left_id", "right_id", "lag_us"]] \
        .sort_values(["key", "left_id", "right_id"]).reset_index(drop=True)
    want = _brute_interval(ldf, rdf, lo_s * US, hi_s * US)
    pd.testing.assert_frame_equal(got, want)
    assert m["worker_metrics"]["pairs_emitted"] == len(want)


def test_asof_join_stream_fuzz(tmp_path):
    rng = np.random.default_rng(7)
    ldf = _gen_stream(rng, 250, 10, 150, 0)
    rdf = _gen_stream(rng, 250, 10, 150, 10_000)
    ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
    _write_files(ldf, ld, 8)
    _write_files(rdf, rd_, 8)
    out = str(tmp_path / "out")
    run_asof_join_stream(ld, rd_, out, key_col="user_id",
                         allowed_lateness_us=5 * US,
                         partitions=3, files_per_epoch=1)
    got = ExactlyOnceParquetSink(out).read().to_pandas() \
        [["key", "left_id", "right_id", "right_ts_us", "lag_us"]] \
        .sort_values(["key", "left_id"]).reset_index(drop=True)
    for c in ("right_id", "right_ts_us", "lag_us"):
        got[c] = got[c].astype("float64")
    pd.testing.assert_frame_equal(got, _brute_asof(ldf, rdf))
