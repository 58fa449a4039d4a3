"""Remaining control-flow processors: while, for_each, parallel,
rate_limit, cached (SURVEY.md §2.4-2.5).

``parallel`` needs no operator here — Ray's task/actor scheduling IS
the parallelism; per-stage ``concurrency``/``num_cpus`` replace the
reference's goroutine caps.
"""

from __future__ import annotations

import threading
import time
from typing import Callable

import pyarrow as pa


from bento_ray.util import resolve_concurrency as _conc
from bento_ray.util import to_table


def while_stage(ds, check: Callable[[pa.Table], bool],
                fn: Callable[[pa.Table], pa.Table],
                max_loops: int = 100, at_least_once: bool = False):
    """Bento ``while`` (processor_while.go): apply ``fn`` to each batch
    repeatedly while ``check(batch)`` holds (batch-local loop)."""

    def _f(t: pa.Table) -> pa.Table:
        loops = 0
        if at_least_once and max_loops > 0:
            t = fn(t)
            loops = 1
        while loops < max_loops and check(t):
            t = fn(t)
            loops += 1
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


def for_each(ds, fn: Callable[[pa.Table], pa.Table]):
    """Bento ``for_each`` (processor_for_each.go): apply ``fn`` to each
    row in isolation — disables batch-local effects (batch_index(),
    cross-row references). Slow by design; use only when semantics
    require it."""

    def _f(t: pa.Table) -> pa.Table:
        outs = [fn(t.slice(i, 1)) for i in range(len(t))]
        if not outs:
            return t
        return pa.concat_tables(outs, promote_options="default")

    return ds.map_batches(_f, batch_format="pyarrow")


class TokenBucket:
    """Local token-bucket rate limiter (rate_limit_local.go:16). One
    instance per actor throttles that actor's batches; for a GLOBAL
    limit across the pool use a zero-cpu limiter actor and ray.get a
    grant per batch."""

    def __init__(self, count: int, interval_sec: float):
        self.count = count
        self.interval = interval_sec
        self._tokens = count
        self._stamp = time.monotonic()
        self._lock = threading.Lock()

    def acquire(self, n: int = 1) -> None:
        # a request larger than the bucket capacity can never be
        # satisfied in one refill — drain it in capacity-sized
        # chunks across intervals (total wait ≈ n/count intervals)
        # instead of spinning forever
        remaining = n
        while remaining > 0:
            take = min(remaining, self.count)
            while True:
                with self._lock:
                    now = time.monotonic()
                    if now - self._stamp >= self.interval:
                        self._tokens = self.count
                        self._stamp = now
                    if self._tokens >= take:
                        self._tokens -= take
                        break
                    wait = self.interval - (now - self._stamp)
                time.sleep(max(wait, 0.001))
            remaining -= take


class RateLimitedStage:
    """Throttled enrichment stage: per-actor token bucket around an
    inner batch fn (the http/external-call idiom)."""

    def __init__(self, fn, count: int, interval_sec: float,
                 per_row: bool = False):
        self.fn = fn
        self.bucket = TokenBucket(count, interval_sec)
        self.per_row = per_row

    def __call__(self, t: pa.Table) -> pa.Table:
        self.bucket.acquire(len(t) if self.per_row else 1)
        return self.fn(t)


def rate_limit_stage(ds, fn, count: int, interval_sec: float,
                     per_row: bool = False, concurrency: int | None = None):
    return ds.map_batches(RateLimitedStage,
                          fn_constructor_args=(fn, count, interval_sec, per_row),
                          batch_format="pyarrow", concurrency=_conc(concurrency))


class CachedEnricher:
    """Bento ``cached`` processor (processor_cached.go:17-35): memoise a
    per-key enrichment under a TTL'd LRU, one cache per actor. ``fn``
    computes values for a list of keys (batched misses only)."""

    def __init__(self, fn: Callable[[list], list], key_col: str,
                 out_col: str, ttl_sec: float | None = None,
                 max_items: int = 100_000):
        from bento_ray.state.store import LocalCache

        self.fn = fn
        self.key_col = key_col
        self.out_col = out_col
        self.cache = LocalCache(ttl_sec, max_items)
        self.hits = 0
        self.misses = 0

    def __call__(self, t: pa.Table) -> pa.Table:
        t = to_table(t)
        keys = t.column(self.key_col).to_pylist()
        vals: list = [None] * len(keys)
        miss_idx: dict = {}
        for i, k in enumerate(keys):
            v = self.cache.get(k)
            if v is not None:
                vals[i] = v
                self.hits += 1
            else:
                miss_idx.setdefault(k, []).append(i)
        if miss_idx:
            self.misses += len(miss_idx)
            computed = self.fn(list(miss_idx))
            for k, v in zip(miss_idx, computed):
                self.cache.set(k, v)
                for i in miss_idx[k]:
                    vals[i] = v
        return t.append_column(self.out_col, pa.array(vals))


def cached_stage(ds, fn, key_col: str, out_col: str,
                 ttl_sec: float | None = None, concurrency: int | None = None):
    return ds.map_batches(CachedEnricher,
                          fn_constructor_args=(fn, key_col, out_col, ttl_sec),
                          batch_format="pyarrow", concurrency=_conc(concurrency))
