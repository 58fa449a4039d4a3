"""Bloblang function registry (scalar, per-message).

Reference: internal/bloblang/query/functions.go registrations. Only
environment/message accessors and generators — methods live in
methods.py.
"""

from __future__ import annotations

import datetime
import os
import random
import socket
import time
import uuid

from bento_ray.blobl.values import (
    DELETE, NOTHING, BloblangError, get_int, get_string,
)


# seeded random_int RNGs, one per distinct seed per process (the
# reference's per-instantiation RNG)
_SEEDED_RNGS: dict = {}


def _dot_path(path: str) -> list[str]:
    if path == "":
        return []
    # gabs DotPathToSlice with ~1 escape for literal dots
    return [p.replace("~1", ".").replace("~0", "~")
            for p in path.split(".")]


# static-path file() contents, read once per process (io/bloblang.go
# ImportFile caching)
_FILE_CACHE: dict[str, bytes] = {}


def call_function(name, arg_qs, kwarg_qs, ctx, ev):
    if name == "counter":
        # impl/pure/bloblang_general.go:16-160: per-INSTANTIATION
        # counter; min/max resolved once per mapping lifetime; `set`
        # executed lazily each resolution (null → peek, delete →
        # reset, int → set-and-yield, nothing → normal increment).
        # State keys off the call site's arg containers (fresh per
        # parse) inside the process-lifetime counters dict.
        skey = ("__counter__", id(arg_qs), id(kwarg_qs))
        st = ctx.counters.get(skey)
        if st is None:
            qmin = kwarg_qs.get("min",
                                arg_qs[0] if len(arg_qs) > 0 else None)
            qmax = kwarg_qs.get("max",
                                arg_qs[1] if len(arg_qs) > 1 else None)
            mn = get_int(ev(qmin, ctx)) if qmin is not None else 1
            mx = get_int(ev(qmax, ctx)) if qmax is not None \
                else (1 << 63) - 1
            if mn < 0:
                raise BloblangError(
                    f"failed to resolve min argument: min argument "
                    f"must be >0, got {mn}")
            if mx < 0 or mx <= mn:
                raise BloblangError(
                    f"failed to resolve max argument: max argument "
                    f"must be >0 and >min, got {mx}")
            st = {"min": mn, "max": mx, "i": mn - 1}
            ctx.counters[skey] = st
        qset = kwarg_qs.get("set",
                            arg_qs[2] if len(arg_qs) > 2 else None)
        if qset is not None:
            sv = ev(qset, ctx)
            if sv is None:
                return st["i"]
            if sv is DELETE:
                st["i"] = st["min"] - 1
            elif sv is not NOTHING:
                iv = get_int(sv)
                st["i"] = iv
                return iv
        st["i"] += 1
        v = st["i"]
        if v >= st["max"]:
            st["i"] = st["min"] - 1
        return v

    args = [ev(q, ctx) for q in arg_qs]
    kwargs = {k: ev(q, ctx) for k, q in kwarg_qs.items()}

    if name == "deleted":
        return DELETE
    if name == "content":
        return ctx.batch[ctx.index].content_bytes()
    if name == "json":
        path = get_string(args[0]) if args else kwargs.get("path", "")
        doc = ctx.batch[ctx.index].structured()
        from bento_ray.blobl.interp import walk_path

        return walk_path(doc, _dot_path(path))
    if name in ("meta", "metadata"):
        if args or kwargs:
            key = get_string(args[0] if args else kwargs.get("key"))
            return ctx.meta.get(key)
        return dict(ctx.meta)
    if name == "env":
        key = get_string(args[0] if args else kwargs.get("name"))
        v = ctx.env.get(key)
        return v
    if name == "var":
        key = get_string(args[0])
        return ctx.vars.get(key)
    if name == "batch_index":
        return ctx.index
    if name == "batch_size":
        return len(ctx.batch)
    if name == "count":
        key = get_string(args[0])
        ctx.counters[key] = ctx.counters.get(key, 0) + 1
        return ctx.counters[key]
    if name == "error":
        return ctx.legacy.get("error")
    if name == "errored":
        return ctx.legacy.get("error") is not None
    if name == "range":
        start = get_int(args[0] if args else kwargs.get("start", 0))
        stop = get_int(args[1] if len(args) > 1 else kwargs.get("stop"))
        step = get_int(args[2] if len(args) > 2 else kwargs.get("step", 1))
        return list(range(start, stop, step))
    if name == "now":
        return datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%f") + "Z"
    if name == "timestamp_unix":
        return int(time.time())
    if name == "timestamp_unix_milli":
        return int(time.time() * 1000)
    if name == "timestamp_unix_micro":
        return int(time.time() * 1e6)
    if name == "timestamp_unix_nano":
        return int(time.time() * 1e9)
    if name == "uuid_v4":
        return str(uuid.uuid4())
    if name == "uuid_v7":
        return str(uuid.uuid4())  # v7 unavailable in stdlib; random
    if name == "nanoid":
        alphabet = ("useandom26T198340PX75pxJACKVERYMINDBUSHWOLF_GQZbfghjkl"
                    "qvwyzrict")
        ln = get_int(args[0]) if args else 21
        return "".join(random.choice(alphabet) for _ in range(ln))
    if name == "ksuid":
        import base64 as _b

        return _b.b32encode(os.urandom(17)).decode().lower()[:27]
    if name == "snowflake_id":
        # bwmarrin/snowflake layout (lang/bloblang.go:96-120):
        # 41-bit ms since twitter epoch | 10-bit node_id | 12-bit seq
        node_id = get_int(kwargs.get("node_id",
                                     args[0] if args else 1)) & 0x3FF
        ms = int(time.time() * 1000) - 1288834974657
        return str((ms << 22) | (node_id << 12) | random.getrandbits(12))
    if name == "random_int":
        seed = kwargs.get("seed")
        mn = get_int(kwargs.get("min", args[0] if args else 0))
        mx = get_int(kwargs.get("max", args[1] if len(args) > 1
                                else (1 << 63) - 1))
        if seed is not None:
            # ONE seeded RNG per seed, drawn from per call — a fresh
            # Random(seed) per invocation returned the identical
            # value for every message (the reference seeds the RNG
            # once at function instantiation)
            key = get_int(seed)
            rng = _SEEDED_RNGS.get(key)
            if rng is None:
                rng = _SEEDED_RNGS[key] = random.Random(key)
        else:
            rng = random
        return rng.randint(mn, mx)
    if name == "hostname":
        return socket.gethostname()
    if name in ("file", "file_rel"):
        # io/bloblang.go:82,135: read file contents as bytes; static
        # paths cached for the mapping lifetime unless no_cache.
        # file_rel resolves relative to the mapping's directory (here
        # the active config base dir when one is set).
        path = get_string(args[0] if args else kwargs.get("path"))
        no_cache = bool(kwargs.get("no_cache",
                                   args[1] if len(args) > 1 else False))
        if name == "file_rel" and not os.path.isabs(path):
            from bento_ray.config.processors import _BASE_DIR

            if _BASE_DIR:
                path = os.path.join(_BASE_DIR[0], path)
        try:
            if no_cache:
                with open(path, "rb") as f:
                    return f.read()
            if path not in _FILE_CACHE:
                with open(path, "rb") as f:
                    _FILE_CACHE[path] = f.read()
            return _FILE_CACHE[path]
        except OSError as e:
            raise BloblangError(str(e)) from None
    if name == "throw":
        raise BloblangError(get_string(args[0]))
    if name == "pi":
        import math

        return math.pi
    if name == "cosine_similarity":
        # impl/pure/bloblang_numbers_v2.go:35-92
        a = args[0] if args else kwargs.get("a")
        b = args[1] if len(args) > 1 else kwargs.get("b")
        for v in (a, b):
            if not isinstance(v, list) or any(
                    isinstance(x, bool) or
                    not isinstance(x, (int, float)) for x in v):
                raise BloblangError(
                    "vector must be an array of numeric types")
        if len(a) != len(b):
            raise BloblangError("vectors must be equal length")
        if not a:
            raise BloblangError("vectors cannot be empty")
        dot = ss_a = ss_b = 0.0
        for fa, fb in zip(a, b):
            dot += fa * fb
            ss_a += fa * fa
            ss_b += fb * fb
        if ss_a == 0 or ss_b == 0:
            raise BloblangError("vectors must not be null (all zeros)")
        return dot / ((ss_a ** 0.5) * (ss_b ** 0.5))
    if name == "tracing_id":
        # functions.go tracing_id: zeroed when no span (no tracer in
        # this runtime)
        return "00000000000000000000000000000000"
    if name == "tracing_span":
        return None
    if name == "fake":
        from bento_ray.fakegen import get_fake_value

        kind = get_string(args[0]) if args else ""
        try:
            return get_fake_value(kind)
        except ValueError as e:
            raise BloblangError(str(e)) from None
    if name == "ulid":
        # registerULID (lang/bloblang.go:243+): 48-bit ms timestamp +
        # 80-bit randomness; crockford base32 (26 chars) or hex (32);
        # random_source secure_random/fast_random
        encoding = get_string(args[0]) if args else \
            get_string(kwargs.get("encoding", "crockford"))
        source = get_string(args[1]) if len(args) > 1 else \
            get_string(kwargs.get("random_source", "secure_random"))
        if source == "secure_random":
            rnd = os.urandom(10)
        elif source == "fast_random":
            rnd = random.getrandbits(80).to_bytes(10, "big")
        else:
            raise BloblangError(
                f"invalid random source: {source}")
        raw = (int(time.time() * 1000) & ((1 << 48) - 1)).to_bytes(
            6, "big") + rnd
        if encoding == "hex":
            return raw.hex()
        if encoding != "crockford":
            raise BloblangError(f"invalid ulid encoding: {encoding}")
        alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
        n = int.from_bytes(raw, "big")
        return "".join(alphabet[(n >> (5 * i)) & 31]
                       for i in range(25, -1, -1))
    raise BloblangError(f"unrecognised function '{name}'")
