"""Per-record / per-batch operators (the reference's "pure" processors)
re-expressed as vectorized Arrow batch transforms.

Reference semantics (cited per function): every processor is
``ProcessBatch(batch) -> []batch``; here a *semantic* batch is either a
whole Dataset (stateless ops distribute over Ray blocks transparently)
or one window pane / policy batch (pane-local ops take and return a
``pyarrow.Table``).
"""

from __future__ import annotations

import json
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from bento_ray.util import to_table


def mapping(ds, fn: Callable[[pa.Table], pa.Table], *, batch_size: int | None = None,
            concurrency=None):
    """Bento ``mapping`` processor (processor_mapping.go:14,146): build a
    new document per message. Here: one vectorized batch fn over
    zero-copy Arrow batches; dropping rows (Bloblang ``deleted()``) is a
    mask inside ``fn``; errors should be recorded in an ``err`` column
    (see compose.try_stage) rather than raised."""
    kwargs = {"batch_format": "pyarrow"}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(fn, **kwargs)


#: Bento ``mutation`` (processor_mutation.go:12) is an in-place perf
#: variant of ``mapping``; columnar batches make the distinction moot.
mutation = mapping


def filter_rows(ds, predicate: Callable[[pa.Table], pa.Array]):
    """Filter via vectorized boolean mask (Bloblang
    ``root = if <check> { deleted() }`` idiom, processor_mapping.go:50-85).
    ``predicate`` returns a BooleanArray of rows to KEEP."""

    def _f(t: pa.Table) -> pa.Table:
        mask = predicate(t)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
            mask = pa.array(mask, pa.bool_())
        return t.filter(mask)

    return ds.map_batches(_f, batch_format="pyarrow")


def split_batches(ds, size: int):
    """Bento ``split`` processor (processor_split.go:61): re-chunk the
    stream into batches of at most ``size`` messages. In Ray Data batch
    boundaries are physical; semantic re-batching = map_batches with an
    explicit batch_size, tagging each batch with a ``batch_id``.

    batch_id uniqueness: a plain closure counter would be re-pickled per
    Ray task (restarting at 0 in every worker), so each map_batches
    WORKER leases a disjoint id block from a zero-CPU counter actor —
    one RPC per lease of 2^16 ids, amortized to ~zero per batch."""
    from bento_ray.metrics import _CounterActor

    counter = _CounterActor.remote()
    block = 1 << 16

    class _Tagger:
        def __init__(self):
            self._next = 0
            self._end = 0

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._next >= self._end:
                import ray

                lease = ray.get(counter.next_value.remote("split_batches"))
                self._next = (lease - 1) * block
                self._end = lease * block
            bid = self._next
            self._next += 1
            return t.append_column(
                "batch_id", pa.array([bid] * len(t), pa.int64()))

    return ds.map_batches(_Tagger, batch_format="pyarrow", batch_size=size,
                          concurrency=(1, 4))


def archive(table: pa.Table, fmt: str = "json_array", content_col: str = "content") -> pa.Table:
    """Bento ``archive`` (processor_archive.go:21,186-196): batch → one
    message. Supported formats: ``json_array`` (rows → one JSON array
    document), ``lines`` (newline-joined), ``concatenate`` (byte concat).
    Pane-local: takes one semantic batch, returns a 1-row table."""
    t = to_table(table)
    if fmt == "json_array":
        rows = t.to_pylist()
        payload = json.dumps(rows, default=str, separators=(",", ":"))
    elif fmt == "lines":
        col = t.column(content_col).to_pylist()
        payload = "\n".join(str(v) for v in col)
    elif fmt == "concatenate":
        col = t.column(content_col).to_pylist()
        payload = "".join(str(v) for v in col)
    else:
        raise ValueError(f"unsupported archive format: {fmt}")
    return pa.table({"content": pa.array([payload], pa.string())})


def unarchive(table: pa.Table, fmt: str = "json_array", content_col: str = "content") -> pa.Table:
    """Bento ``unarchive`` (processor_unarchive.go:24,336-352): one
    message → batch. ``json_array`` explodes a JSON array document into
    one row per element; ``lines`` splits on newlines."""
    t = to_table(table)
    out_rows: list = []
    for v in t.column(content_col).to_pylist():
        if v is None:
            continue
        if fmt == "json_array":
            arr = json.loads(v)
            if not isinstance(arr, list):
                raise ValueError("json_array unarchive: document is not an array")
            out_rows.extend(arr)
        elif fmt == "lines":
            out_rows.extend({"content": line} for line in str(v).split("\n"))
        else:
            raise ValueError(f"unsupported unarchive format: {fmt}")
    if not out_rows:
        return pa.table({"content": pa.array([], pa.string())})
    return pa.Table.from_pylist(out_rows)


def insert_part(table: pa.Table, index: int, row: dict) -> pa.Table:
    """Bento ``insert_part`` (processor_insert_part.go): insert a new
    message at a batch index; negative indices count from the end, out
    of range appends/prepends."""
    t = to_table(table)
    n = len(t)
    i = index if index >= 0 else n + index + 1
    i = max(0, min(n, i))
    new = pa.Table.from_pylist([row], schema=t.schema)
    return pa.concat_tables([t.slice(0, i), new, t.slice(i)],
                            promote_options="default")


def noop(ds):
    """Bento ``noop``: identity."""
    return ds


def log_stage(ds, logger=None, prefix: str = "batch"):
    """Bento ``log`` processor: observe batches without altering them
    (driver-side logging per batch via print/logger)."""
    import logging

    log = logger or logging.getLogger("bento_ray")

    def _f(t: pa.Table) -> pa.Table:
        log.info("%s: %d rows, %d cols", prefix, len(t), len(t.column_names))
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def select_parts(table: pa.Table, indices: list[int]) -> pa.Table:
    """Bento ``select_parts``: pick rows of a semantic batch by index,
    negative indices from the end (message.go:47-61)."""
    t = to_table(table)
    n = len(t)
    resolved = [i if i >= 0 else n + i for i in indices]
    resolved = [i for i in resolved if 0 <= i < n]
    return t.take(pa.array(resolved, pa.int64()))


def bounds_check(ds, *, min_rows: int = 0, max_rows: int | None = None,
                 min_bytes: int = 0, max_bytes: int | None = None,
                 content_col: str | None = None):
    """Bento ``bounds_check`` (processor_bounds_check.go): drop batches /
    rows outside size bounds. Row-level byte bounds use the binary/string
    length of ``content_col``."""

    def _f(t: pa.Table) -> pa.Table:
        if len(t) < min_rows or (max_rows is not None and len(t) > max_rows):
            return t.slice(0, 0)
        if content_col is not None:
            lens = pc.binary_length(t.column(content_col))
            mask = pc.greater_equal(lens, pa.scalar(min_bytes))
            if max_bytes is not None:
                mask = pc.and_(mask, pc.less_equal(lens, pa.scalar(max_bytes)))
            t = t.filter(mask)
        return t

    return ds.map_batches(_f, batch_format="pyarrow")
