"""Window boundary arithmetic parity with buffer_system_window.go
nextSystemWindow (:234-266): left-open/right-closed, UTC-epoch aligned,
window_end_timestamp RFC3339Nano."""

import numpy as np
import pyarrow as pa

from bento_ray.stages.window import (
    assign_sliding,
    assign_tumbling,
    tumbling_window_end,
)
from bento_ray.util import rfc3339nano

S = 10_000_000  # 10s in µs


def test_tumbling_left_open_right_closed():
    # ts exactly on a boundary belongs to the window ENDING there
    ts = np.array([1, S - 1, S, S + 1, 2 * S], np.int64)
    ends = tumbling_window_end(ts, S)
    assert ends.tolist() == [S, S, S, 2 * S, 2 * S]


def test_tumbling_offset():
    off = 3_000_000
    ts = np.array([off, off + 1, off + S], np.int64)
    ends = tumbling_window_end(ts, S, off)
    assert ends.tolist() == [off, off + S, off + S]


def test_assign_tumbling_column():
    t = pa.table({"ts": pa.array([1, S, S + 1], pa.timestamp("us", tz="UTC"))})
    out = assign_tumbling(t, "ts", S)
    got = out.column("window_end").cast(pa.int64()).to_pylist()
    assert got == [S, S, 2 * S]


def test_sliding_duplicates_into_every_pane():
    # size=10s slide=5s → every row lands in exactly 2 panes
    t = pa.table({"ts": pa.array([7_000_000], pa.timestamp("us", tz="UTC"))})
    out = assign_sliding(t, "ts", S, S // 2)
    ends = sorted(out.column("window_end").cast(pa.int64()).to_pylist())
    # ts=7s: panes (0,10] and (5,15]
    assert ends == [10_000_000, 15_000_000]


def test_sliding_boundary():
    t = pa.table({"ts": pa.array([10_000_000], pa.timestamp("us", tz="UTC"))})
    out = assign_sliding(t, "ts", S, S // 2)
    ends = sorted(out.column("window_end").cast(pa.int64()).to_pylist())
    # ts exactly 10s: panes (0,10] and (5,15]
    assert ends == [10_000_000, 15_000_000]


def test_rfc3339nano_format():
    # Go time.RFC3339Nano: trailing zeros trimmed, no frac when zero, Z
    base = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    assert rfc3339nano(base) == "2024-01-01T00:00:00Z"
    assert rfc3339nano(base + 10_000_000) == "2024-01-01T00:00:10Z"
    assert rfc3339nano(base + 1_500_000) == "2024-01-01T00:00:01.5Z"
    assert rfc3339nano(base + 123_456) == "2024-01-01T00:00:00.123456Z"
    assert rfc3339nano(base + 120_000) == "2024-01-01T00:00:00.12Z"
