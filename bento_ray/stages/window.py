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
import pyarrow.compute as pc

US = 1_000_000


def _ts_us(col) -> np.ndarray:
    """Timestamp column → int64 MICROSECONDS. Non-us units (pandas
    writes ns by default) are normalized first — a raw int64 cast of a
    ns column would silently make every window 1000× off."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type) and col.type.unit != "us":
        col = col.cast(pa.timestamp("us", tz=col.type.tz))
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
    # normalize to MICROSECONDS first — pandas timestamps are ns by
    # default and a raw int64 view would compare ns gaps against a
    # µs threshold (the 1000× bug _ts_us guards in the Arrow paths)
    ts = _ts_us(pa.Array.from_pandas(g[ts_col]))
    new_session = np.ones(len(ts), dtype=bool)
    if len(ts) > 1:
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    session_id = np.cumsum(new_session) - 1
    last = pd.Series(ts).groupby(session_id).transform("max").to_numpy()
    g[end_col] = pd.to_datetime(last + gap_us, unit="us", utc=True)
    return g


def session_breaks(keys: pa.Array, ts: np.ndarray, gap_us: int) -> np.ndarray:
    """Boolean session-start mask over rows sorted by (key, ts): a new
    session starts at row 0, at every key change, and whenever the gap
    from the previous event exceeds ``gap_us``. One vectorized pass —
    no per-key Python (measured: ``groupby(key).map_groups`` costs one
    Python call per key, 20s+ on 80k rows of mostly-small groups)."""
    n = len(ts)
    brk = np.ones(n, dtype=bool)
    if n > 1:
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        same = pc.fill_null(
            pc.equal(keys.slice(1), keys.slice(0, n - 1)), False
        ).to_numpy(zero_copy_only=False).astype(bool)
        brk[1:] = (~same) | ((ts[1:] - ts[:-1]) > gap_us)
    return brk


def assign_sessions_table(t: pa.Table, key_col: str, ts_col: str,
                          gap_us: int, end_col: str = "window_end") -> pa.Table:
    """Vectorized session assignment over one whole hash partition
    (all keys at once): sort by (key, ts), one break scan, one
    segment-max for window_end. Replaces the per-key map_groups path."""
    n = len(t)
    if n == 0:
        return t.append_column(
            end_col, pa.array([], pa.timestamp("us", tz="UTC")))
    idx = pc.sort_indices(
        t, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")])
    t = t.take(idx)
    ts = _ts_us(t.column(ts_col))
    brk = session_breaks(t.column(key_col), ts, gap_us)
    starts = np.flatnonzero(brk)
    counts = np.diff(np.r_[starts, n])
    seg_last = ts[np.r_[starts[1:], n] - 1]
    wend = np.repeat(seg_last + gap_us, counts)
    return t.append_column(
        end_col, pa.array(wend, pa.timestamp("us", tz="UTC")))


def assign_session_windows(ds, key_col: str, ts_col: str, gap_us: int,
                           end_col: str = "window_end",
                           num_partitions: int | None = None):
    """Session windows per key, partition-level vectorized: hash the key
    into ``num_partitions`` coarse partitions (one shuffle), then run
    ONE vectorized multi-key break scan per partition — P Python calls
    total instead of one per key. At 100 TB, P scales with the cluster
    core count and each partition must fit a worker's heap; the key
    hash keeps all rows of a key co-located regardless of P."""
    from bento_ray.util import salted_partition

    if num_partitions is None:
        from bento_ray.util import cluster_cpus

        num_partitions = max(4, cluster_cpus())

    P = num_partitions

    def _pid(t: pa.Table) -> pa.Table:
        pid = salted_partition(t.column(key_col), P)
        return t.append_column("__pid", pa.array(pid, pa.int64()))

    def _sessions(t: pa.Table) -> pa.Table:
        out = assign_sessions_table(t, key_col, ts_col, gap_us, end_col)
        return out.drop_columns(["__pid"])

    return (ds.map_batches(_pid, batch_format="pyarrow")
              .groupby("__pid")
              .map_groups(_sessions, batch_format="pyarrow"))


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
