"""Keyed state stores — the reference's cache resources.

Reference semantics (SURVEY.md §2.5): caches are named shared resources
with ``Get / Set / Add / Delete`` where **Add fails if the key already
exists** — the dedupe primitive (processor_dedupe.go:175). The
implementations mirrored here: ``memory`` (TTL map, cache_memory.go:16),
``lru`` (cache_lru.go:42), ``ttlru`` (cache_ttlru.go:33).

Ray-Data-first mapping: a cache used by a *single* pipeline stage lives
inside that stage's actors (one shard per partition — no cross-actor
traffic; this is how the streaming dedupe state works,
streaming/actors.py). A cache shared *across* stages or pipelines is a
small pool of ``CacheActor`` shards keyed by ``hash(key) % shards``,
accessed through ``CacheClient`` — batch the ops (``madd``/``mget``)
so the per-batch cost is one RPC per shard touched, never one per row.
"""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict

import ray


class LocalCache:
    """In-process cache shard: TTL + optional LRU capacity bound."""

    def __init__(self, ttl_sec: float | None = None,
                 max_items: int | None = None):
        self.ttl = ttl_sec
        self.cap = max_items
        self._d: OrderedDict = OrderedDict()
        self._since_sweep = 0

    def _expired(self, ts: float) -> bool:
        return self.ttl is not None and (time.monotonic() - ts) > self.ttl

    def _evict(self) -> None:
        while self.cap is not None and len(self._d) > self.cap:
            self._d.popitem(last=False)
        # amortized TTL compaction (cache_memory.go compacts on an
        # interval): lazily-expired entries are otherwise only purged
        # by a get() of the SAME key, which dedupe workloads never
        # issue — an uncapped TTL cache would grow without bound
        if self.ttl is not None:
            self._since_sweep += 1
            if self._since_sweep >= max(1024, len(self._d) // 4):
                self._since_sweep = 0
                now = time.monotonic()
                dead = [k for k, (_, ts) in self._d.items()
                        if (now - ts) > self.ttl]
                for k in dead:
                    del self._d[k]

    def get(self, key):
        v = self._d.get(key)
        if v is None:
            return None
        val, ts = v
        if self._expired(ts):
            del self._d[key]
            return None
        self._d.move_to_end(key)
        return val

    def set(self, key, value) -> None:
        self._d[key] = (value, time.monotonic())
        self._d.move_to_end(key)
        self._evict()

    def add(self, key, value) -> bool:
        """Insert only if absent. Returns False when the key exists
        (the dedupe contract: second add of the same key fails)."""
        if self.get(key) is not None:
            return False
        self.set(key, value)
        return True

    def delete(self, key) -> None:
        self._d.pop(key, None)

    def madd(self, keys, value=b"t") -> list[bool]:
        return [self.add(k, value) for k in keys]

    def mget(self, keys) -> list:
        return [self.get(k) for k in keys]

    def __len__(self) -> int:
        return len(self._d)


class FileCache:
    """``file`` cache (internal/impl/io/cache_file.go:18): one file per
    key under a directory; Add uses O_EXCL creation so the
    fails-if-exists contract holds across PROCESSES sharing the
    directory (the dedupe primitive on shared storage)."""

    def __init__(self, directory: str):
        import os

        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, key) -> str:
        import os
        from urllib.parse import quote

        # injective, filesystem-safe encoding: the old replace('/',
        # '_') collided distinct keys ('a/b' vs 'a_b' — a silent
        # dedupe false-positive) and let '..' escape the directory
        safe = quote(str(key), safe="")
        if safe in (".", ".."):
            safe = safe.replace(".", "%2E")
        return os.path.join(self.dir, safe)

    def get(self, key):
        try:
            with open(self._path(key), "rb") as fh:
                return fh.read()
        except FileNotFoundError:
            return None

    def set(self, key, value) -> None:
        with open(self._path(key), "wb") as fh:
            fh.write(value if isinstance(value, bytes)
                     else str(value).encode())

    def add(self, key, value=b"t") -> bool:
        import os

        try:
            fd = os.open(self._path(key),
                         os.O_RDWR | os.O_CREAT | os.O_EXCL, 0o644)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(value if isinstance(value, bytes)
                     else str(value).encode())
        return True

    def delete(self, key) -> None:
        import contextlib
        import os

        with contextlib.suppress(FileNotFoundError):
            os.unlink(self._path(key))

    def madd(self, keys, value=b"t") -> list[bool]:
        return [self.add(k, value) for k in keys]

    def mget(self, keys) -> list:
        return [self.get(k) for k in keys]

    def __len__(self) -> int:
        import os

        return len(os.listdir(self.dir))


class MultilevelCache:
    """``multilevel`` cache (cache_multilevel.go:108-176): Get checks
    levels in order and back-fills hits into the levels above; Set
    writes all levels; Add requires the key absent from every level,
    performing the atomic Add only on the LAST level (the others get a
    passive Set)."""

    def __init__(self, levels: list):
        if not levels:
            raise ValueError("multilevel cache requires at least one level")
        self.levels = levels

    def get(self, key):
        for i, c in enumerate(self.levels):
            v = c.get(key)
            if v is not None:
                for j in range(i):
                    self.levels[j].set(key, v)
                return v
        return None

    def set(self, key, value) -> None:
        for c in self.levels:
            c.set(key, value)

    def add(self, key, value=b"t") -> bool:
        for c in self.levels[:-1]:
            if c.get(key) is not None:
                return False
        if not self.levels[-1].add(key, value):
            return False
        for c in self.levels[:-1]:
            c.set(key, value)
        return True

    def delete(self, key) -> None:
        for c in self.levels:
            c.delete(key)

    def madd(self, keys, value=b"t") -> list[bool]:
        return [self.add(k, value) for k in keys]

    def mget(self, keys) -> list:
        return [self.get(k) for k in keys]


@ray.remote
class CacheActor:
    """One shard of a shared named cache."""

    def __init__(self, ttl_sec: float | None = None,
                 max_items: int | None = None):
        self.cache = LocalCache(ttl_sec, max_items)

    def get(self, key):
        return self.cache.get(key)

    def set(self, key, value):
        self.cache.set(key, value)

    def add(self, key, value=b"t") -> bool:
        return self.cache.add(key, value)

    def delete(self, key):
        self.cache.delete(key)

    def madd(self, keys, value=b"t") -> list[bool]:
        return self.cache.madd(keys, value)

    def mget(self, keys) -> list:
        return self.cache.mget(keys)

    def size(self) -> int:
        return len(self.cache)


class CacheClient:
    """Sharded client for a shared cache: batch ops routed by key hash.
    Serializable — workers holding a client talk straight to the shard
    actors."""

    def __init__(self, shards: int = 4, ttl_sec: float | None = None,
                 max_items: int | None = None):
        per = None if max_items is None else max(1, max_items // shards)
        self.actors = [CacheActor.options(num_cpus=0).remote(ttl_sec, per)
                       for _ in range(shards)]
        self.shards = shards

    def _shard(self, key) -> int:
        # Builtin hash() is PYTHONHASHSEED-salted per process for
        # str/bytes, so two Ray workers would route the same key to
        # different shards and Add-based dedupe would silently admit
        # duplicates. Use a process-stable digest instead.
        if not isinstance(key, (bytes, bytearray)):
            key = str(key).encode()
        return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(),
                              "big") % self.shards

    def _route(self, keys) -> dict[int, list[tuple[int, object]]]:
        out: dict[int, list[tuple[int, object]]] = {}
        for i, k in enumerate(keys):
            out.setdefault(self._shard(k), []).append((i, k))
        return out

    def madd(self, keys, value=b"t") -> list[bool]:
        res = [False] * len(keys)
        routed = self._route(keys)
        futs = {s: self.actors[s].madd.remote([k for _, k in items], value)
                for s, items in routed.items()}
        for s, items in routed.items():
            for (i, _), ok in zip(items, ray.get(futs[s])):
                res[i] = ok
        return res

    def mget(self, keys) -> list:
        res = [None] * len(keys)
        routed = self._route(keys)
        futs = {s: self.actors[s].mget.remote([k for _, k in items])
                for s, items in routed.items()}
        for s, items in routed.items():
            for (i, _), v in zip(items, ray.get(futs[s])):
                res[i] = v
        return res

    def add(self, key, value=b"t") -> bool:
        return self.madd([key], value)[0]

    def get(self, key):
        return self.mget([key])[0]

    def set(self, key, value):
        ray.get(self.actors[self._shard(key)].set.remote(key, value))

    def delete(self, key):
        ray.get(self.actors[self._shard(key)].delete.remote(key))
