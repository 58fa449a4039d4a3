"""Batching policy + cross-batch dedupe over *semantic* batches.

Reference: ``internal/batch/policy/policy.go:103-135`` — a batch closes
when any trigger fires: ``count`` reached, ``byte_size`` exceeded, a
Bloblang ``check`` matches the just-added message (the triggering row is
INCLUDED), or ``period`` elapses (re-expressed as watermark epochs in
the streaming engine). A final partial batch flushes at end of input.

These operate on sequences of pyarrow Tables (semantic batches — window
panes or explicit batcher outputs), decoupled from Ray's physical
blocks (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pyarrow as pa

from bento_ray.util import to_table


def batch_rows(tables: Iterable[pa.Table], *, count: int | None = None,
               byte_size: int | None = None,
               check: Callable[[pa.Table, int], bool] | None = None,
               size_col: str | None = None) -> Iterator[pa.Table]:
    """Re-batch a stream of tables by policy triggers.

    ``check(table, row_index)`` is evaluated per appended row; a True
    closes the batch INCLUDING that row (policy.go:126-133).
    ``byte_size`` uses the binary/string length of ``size_col``."""
    pending: list[pa.Table] = []
    n = 0
    nbytes = 0

    def _flush() -> pa.Table:
        nonlocal pending, n, nbytes
        out = pa.concat_tables(pending, promote_options="default")
        pending, n, nbytes = [], 0, 0
        return out

    for t in tables:
        t = to_table(t)
        for i in range(len(t)):
            row = t.slice(i, 1)
            pending.append(row)
            n += 1
            if byte_size is not None and size_col is not None:
                v = row.column(size_col)[0].as_py()
                nbytes += len(v) if v is not None else 0
            fire = False
            if count is not None and n >= count:
                fire = True
            if byte_size is not None and nbytes >= byte_size:
                fire = True
            if check is not None and check(row, 0):
                fire = True
            if fire:
                yield _flush()
    if n:
        yield _flush()


def dedupe_stream(tables: Iterable[pa.Table], key_fn: Callable[[pa.Table], list],
                  cache=None, strategy: str = "FIFO") -> Iterator[pa.Table]:
    """Cross-batch dedupe over a stream of semantic batches, exact
    reference semantics (processor_dedupe.go:160-209): per message the
    interpolated key is ``cache.Add``-ed; existing key ⇒ message
    dropped; an entirely-deduplicated batch produces NO output batch.
    FIFO keeps the first occurrence (scan forward), LIFO the last within
    each batch (reverse scan), both emitting survivors in original
    positional order.

    ``cache``: anything with ``madd(keys) -> list[bool]`` —
    state.LocalCache (single-process), state.CacheClient (shared
    actors), or None for a fresh LocalCache."""
    from bento_ray.state.store import LocalCache

    if cache is None:
        cache = LocalCache()
    for t in tables:
        t = to_table(t)
        keys = key_fn(t)
        idx = list(range(len(keys)))
        if strategy.upper() == "LIFO":
            idx = idx[::-1]
        ok = cache.madd([keys[i] for i in idx])
        kept = sorted(i for i, o in zip(idx, ok) if o)
        if kept:
            yield t.take(pa.array(kept, pa.int64()))
