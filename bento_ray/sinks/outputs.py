"""Sinks — the reference's output components (SURVEY.md §2.2).

| reference output | here |
|---|---|
| ``file`` / parquet writes (output_file.go:26) | ``write_parquet/csv/json`` (partitioned dirs) |
| ``drop`` (output_drop.go:18) | ``drop`` (consume without writing) |
| ``switch`` (output_switch.go:38) | ``switch_output`` (predicate route → sink per route) |
| ``broker fan_out`` (output_broker.go:25) | ``fan_out`` |
| ``fallback`` (output_fallback.go:23) | ``fallback`` |
| ``retry`` (output_retry.go:30) | ``retry_sink`` |
| ``reject_errored`` (output_reject_errored.go:23) | ``reject_errored`` (quarantine split) |

The exactly-once idempotent sink (per-partition WAL + manifest) is
``bento_ray.streaming.ExactlyOnceParquetSink`` — the new design the
north rule requires beyond the reference's at-least-once model.
"""

from __future__ import annotations

import time
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc


def write_parquet(ds, path: str, **kw):
    """Partitioned parquet directory — never one giant file; a rerun can
    skip finished partitions (see streaming.ExactlyOnceParquetSink for
    the committed variant)."""
    return ds.write_parquet(path, **kw)


def write_csv(ds, path: str, **kw):
    return ds.write_csv(path, **kw)


def write_json(ds, path: str, **kw):
    return ds.write_json(path, **kw)


def drop(ds) -> int:
    """Ack-and-discard: consume the stream (bench mode), return rows."""
    return ds.count()


def drop_on(ds, sink: Callable, *, error: bool = False,
            error_patterns: list[str] | None = None,
            back_pressure_sec: float | None = None):
    """``drop_on`` output wrapper (output_drop_on.go:43-71): deliver
    through ``sink``; when the sink raises — any error with
    ``error=True``, or an error matching ``error_patterns`` — the batch
    is DROPPED (acked) instead of failing the stream.
    ``back_pressure_sec`` bounds sink wall time; exceeding it drops
    (the connection-loss analog — measured post-hoc here since the
    sink call is synchronous)."""
    import re as _re
    import time as _time

    patterns = [_re.compile(p) for p in (error_patterns or [])]

    t0 = _time.monotonic()
    try:
        result = sink(ds)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if error or any(p.search(msg) for p in patterns):
            return {"dropped": True, "reason": msg}
        raise
    if back_pressure_sec is not None and \
            _time.monotonic() - t0 > back_pressure_sec:
        return {"dropped": True,
                "reason": f"back_pressure > {back_pressure_sec}s"}
    return result


def switch_output(ds, routes: list[tuple[Callable[[pa.Table], pa.Array], Callable]],
                  default: Callable | None = None):
    """Route rows to sinks by first-matching predicate. Each route's
    sink receives a filtered Dataset; evaluation shares the upstream
    plan. Returns per-route results."""
    results = []
    for i, (pred, sink) in enumerate(routes):
        # FIRST-match routing (output_switch.go): a row that also
        # matches an earlier predicate is already claimed — mask the
        # earlier matches out so no row reaches two sinks
        def _route(t: pa.Table, idx=i) -> pa.Table:
            m = routes[idx][0](t)
            for j in range(idx):
                m = pc.and_(m, pc.invert(routes[j][0](t)))
            return t.filter(m)

        results.append(sink(ds.map_batches(_route,
                                           batch_format="pyarrow")))
    if default is not None:
        def _unmatched(t: pa.Table) -> pa.Table:
            if not routes:
                return t               # no cases: everything defaults
            m = None
            for pred, _ in routes:
                # null predicate results route to default, not into
                # the void (filter drops nulls on the route side)
                pm = pc.fill_null(pred(t), False)
                m = pm if m is None else pc.or_(m, pm)
            return t.filter(pc.invert(m))
        results.append(default(ds.map_batches(_unmatched,
                                              batch_format="pyarrow")))
    return results


def fan_out(ds, sinks: list[Callable]):
    """broker fan_out: deliver the same stream to every sink."""
    return [sink(ds) for sink in sinks]


def round_robin(ds, sinks: list[Callable]):
    """broker round_robin/greedy (output_broker.go:247-253): split the
    stream into len(sinks) disjoint shards, one per sink. Ray's
    ``split`` assigns blocks; per-message alternation is meaningless in
    a columnar engine — the contract is disjoint near-equal shares
    that together cover EVERY row (``equal=True`` is documented to
    DROP the remainder when rows don't divide evenly — an output
    broker must never lose messages)."""
    shards = ds.split(len(sinks), equal=False)
    return [sink(shard) for sink, shard in zip(sinks, shards)]


def fallback(ds, sinks: list[Callable]):
    """Try sinks in order; first success wins (output_fallback.go:23)."""
    last_exc = None
    for sink in sinks:
        try:
            return sink(ds)
        except Exception as exc:  # noqa: BLE001 — fallback by contract
            last_exc = exc
    raise last_exc


def retry_sink(ds, sink: Callable, attempts: int = 3, backoff_sec: float = 0.5):
    """Retry the sink with exponential backoff until success/limit."""
    for i in range(attempts):
        try:
            return sink(ds)
        except Exception:  # noqa: BLE001
            if i == attempts - 1:
                raise
            time.sleep(backoff_sec * (2 ** i))


def reject_errored(ds, sink: Callable, quarantine: Callable,
                   err_col: str = "err"):
    """Route rows with a non-null ``err`` to the quarantine sink instead
    of nacking (the reject_errored/drop_on idiom)."""
    ok = ds.map_batches(
        lambda t: t.filter(pc.is_null(t.column(err_col)))
        if err_col in t.column_names else t,
        batch_format="pyarrow")
    bad = ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column(err_col)))
        if err_col in t.column_names else t.slice(0, 0),
        batch_format="pyarrow")
    return sink(ok), quarantine(bad)


def subprocess_output(ds, name: str, args: list[str] | None = None,
                      codec: str = "lines",
                      content_col: str = "content") -> int:
    """``subprocess`` output (output_subprocess.go:15): write each
    message to a child process's stdin with the ``lines`` codec; the
    process is expected to terminate gracefully when stdin closes.
    Single consumer by contract (one child), so batches are drained
    driver-side in order; returns the number of messages written."""
    import subprocess as _sp

    if codec != "lines":
        raise ValueError(f"unsupported subprocess output codec: {codec}")
    proc = _sp.Popen([name, *[str(a) for a in (args or [])]],
                     stdin=_sp.PIPE, stdout=_sp.DEVNULL,
                     stderr=_sp.DEVNULL)
    n = 0
    try:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            col = batch.column(content_col) \
                if content_col in batch.column_names else None
            if col is None:
                import json as _json

                payloads = [_json.dumps(r, separators=(",", ":"),
                                        sort_keys=True).encode()
                            for r in batch.to_pylist()]
            else:
                payloads = [v if isinstance(v, bytes)
                            else str(v).encode()
                            for v in col.to_pylist()]
            for p in payloads:
                proc.stdin.write(p + b"\n")
                n += 1
            proc.stdin.flush()
    finally:
        proc.stdin.close()
        proc.wait()
    return n
