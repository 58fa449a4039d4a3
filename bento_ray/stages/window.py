"""Event-time windowing with reference-parity boundary arithmetic.

Reference: ``system_window`` buffer
(/root/reference/internal/impl/pure/buffer_system_window.go).

Boundary semantics (nextSystemWindow, :234-266, replicated exactly):
windows are aligned to the UTC clock epoch with period ``epoch`` (= the
slide for sliding windows, else the size) and are **left-open,
right-closed**: window *m* covers ``ts ∈ (m·epoch + offset,
m·epoch + offset + size]`` — the Go code sets ``start = rounded + 1ns``
and ``end = start + size - 1ns``, so a ts exactly on a boundary belongs
to the window *ending* there. Every emitted row carries
``window_end_timestamp`` = RFC3339Nano of ``m·epoch + offset + size``
(flushWindow :361,376).

Late data: rows with ``ts ≤ latestFlushedWindowEnd`` are dropped
(:333-336) — in the batch engine this is applied by the streaming
runner's watermark (bento_ray.streaming); in bounded-input mode all
data is on time by construction.

The reference flushes on the system wall clock; here emission is
**watermark-driven** (deterministic, replayable): a pane is final when
``watermark > window_end`` where the watermark is
``max(warc_ts seen) − allowed_lateness`` merged across partitions.

Unlike the reference (no session windows), session windows are
supported: per key, a session extends while consecutive events are
within ``gap``; ``window_end = last_ts + gap``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US = 1_000_000


def _ts_us(col) -> np.ndarray:
    """Timestamp column → int64 microseconds (zero-copy view)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy()


def tumbling_window_end(ts_us: np.ndarray, size_us: int, offset_us: int = 0) -> np.ndarray:
    """window_end for each ts: the unique m·size+offset+size with
    ts ∈ (m·size+offset, m·size+offset+size]. Exact boundary ts maps to
    the window ending AT it (left-open semantics)."""
    rel = ts_us - offset_us
    # ceil(rel / size) * size  (left-open: exact multiples stay put)
    end = ((rel + size_us - 1) // size_us) * size_us + offset_us
    return end


def assign_tumbling(t: pa.Table, ts_col: str, size_us: int, offset_us: int = 0,
                    end_col: str = "window_end") -> pa.Table:
    ends = tumbling_window_end(_ts_us(t.column(ts_col)), size_us, offset_us)
    return t.append_column(end_col, pa.array(ends, pa.timestamp("us", tz="UTC")))


def assign_sliding(t: pa.Table, ts_col: str, size_us: int, slide_us: int,
                   offset_us: int = 0, end_col: str = "window_end") -> pa.Table:
    """Sliding windows: epoch = slide; each row is DUPLICATED into every
    window containing it (size/slide panes), matching the reference's
    per-window copy delivery (buffer_system_window.go spec :45).
    ``size`` must be a multiple of ``slide``."""
    if size_us % slide_us:
        raise ValueError("sliding window size must be a multiple of slide")
    k = size_us // slide_us
    ts = _ts_us(t.column(ts_col))
    rel = ts - offset_us
    # newest window containing ts ends at ceil(rel/slide)*slide + (size - slide)... derive:
    # windows end at e = m*slide + offset + size, membership e-size < ts <= e
    # smallest valid e: e0 = (ceil(rel/slide))*slide + offset ... e ranges e0 + j*slide, j=0..k-1
    e0 = ((rel + slide_us - 1) // slide_us) * slide_us + offset_us
    n = len(ts)
    idx = np.repeat(np.arange(n), k)
    ends = (e0[:, None] + (np.arange(k) * slide_us)[None, :]).reshape(-1)
    out = t.take(pa.array(idx))
    return out.append_column(end_col, pa.array(ends, pa.timestamp("us", tz="UTC")))


def session_windows_group(g: pd.DataFrame, ts_col: str, gap_us: int,
                          end_col: str = "window_end") -> pd.DataFrame:
    """Per-key session assignment over one sorted group (used inside
    ``groupby(key).map_groups``): a new session starts when the gap from
    the previous event exceeds ``gap``; window_end = session's
    last_ts + gap."""
    g = g.sort_values(ts_col, kind="stable").reset_index(drop=True)
    ts = g[ts_col].astype("int64").to_numpy()
    new_session = np.ones(len(ts), dtype=bool)
    if len(ts) > 1:
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    session_id = np.cumsum(new_session) - 1
    last = pd.Series(ts).groupby(session_id).transform("max").to_numpy()
    g[end_col] = pd.to_datetime(last + gap_us, unit="us", utc=True)
    return g


def assign_session_windows(ds, key_col: str, ts_col: str, gap_us: int,
                           end_col: str = "window_end"):
    """Session windows per key. Shuffle: one groupby on the key; within
    each group sorting is local. At 100 TB scale the grouping key should
    be high-cardinality (e.g. user id / url), so groups stay small."""
    return ds.groupby(key_col).map_groups(
        lambda g: session_windows_group(g, ts_col, gap_us, end_col),
        batch_format="pandas",
    )


def windowed_aggregate(ds, ts_col: str, size_us: int, group_cols: list[str],
                       aggs, slide_us: int | None = None, offset_us: int = 0):
    """Tumbling/sliding window + grouped aggregate, two-phase friendly:
    pane assignment is an embarrassingly-parallel map_batches; the only
    shuffle is the final ``groupby(window_end, *group_cols)``.

    ``aggs``: list of ray.data.aggregate.AggregateFn (Sum/Count/...)."""
    if slide_us is None:
        assign = lambda t: assign_tumbling(t, ts_col, size_us, offset_us)  # noqa: E731
    else:
        assign = lambda t: assign_sliding(t, ts_col, size_us, slide_us, offset_us)  # noqa: E731
    ds = ds.map_batches(assign, batch_format="pyarrow")
    return ds.groupby(["window_end", *group_cols]).aggregate(*aggs)
