"""Vectorized scalar-function library — the Bloblang subset
(SURVEY.md §2.8) lowered to pyarrow.compute kernels (with a row-wise
Python fallback only where no kernel exists).

Two registries mirror the reference's split:

- ``FUNCTIONS``: nullary/contextual generators (uuid_v4, ksuid, nanoid,
  now, random_int, range, hostname, env) —
  internal/bloblang/query/functions.go. Generators take ``n`` (rows)
  and an optional ``seed`` so fixtures are deterministic.
- ``METHODS``: value → value transforms keyed by name —
  query/methods_strings.go / methods_numbers.go / methods_structured.go
  / pure/bloblang_time.go. Each takes a pyarrow Array/ChunkedArray
  (plus args) and returns an Array.

Use ``apply_method(table, col, "uppercase", ...)`` inside map_batches,
or compose directly.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import json
import os
import re
import socket
import urllib.parse
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bento_ray.html import go_escape, strip_html


def _as_array(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _pyloop(col, fn, out_type=None):
    """Row-wise fallback for methods with no Arrow kernel."""
    vals = [None if v is None else fn(v) for v in _as_array(col).to_pylist()]
    return pa.array(vals, out_type)


# --------------------------------------------------------------------------
# FUNCTIONS (generators) — functions.go
# --------------------------------------------------------------------------

def fn_uuid_v4(n: int, seed: int | None = None):
    if seed is None:
        return pa.array([str(uuid.uuid4()) for _ in range(n)])
    import random

    rng = random.Random(seed)
    return pa.array([str(uuid.UUID(int=rng.getrandbits(128), version=4))
                     for _ in range(n)])


def fn_nanoid(n: int, seed: int | None = None, size: int = 21):
    import random

    alphabet = "useandom-26T198340PX75pxJACKVERYMINDBUSHWOLF_GQZbfghjklqvwyzrict"
    rng = random.Random(seed) if seed is not None else random.SystemRandom()
    return pa.array(["".join(rng.choice(alphabet) for _ in range(size))
                     for _ in range(n)])


def fn_ksuid(n: int, seed: int | None = None):
    """K-sortable id: 4-byte unix ts + 16 random bytes, base62-ish hex."""
    import random
    import time as _t

    rng = random.Random(seed) if seed is not None else random.SystemRandom()
    ts = int(_t.time())
    return pa.array([f"{ts:08x}{rng.getrandbits(128):032x}" for _ in range(n)])


def fn_now(n: int, seed: int | None = None):
    import datetime as dt

    v = dt.datetime.now(dt.timezone.utc)
    return pa.array([v] * n, pa.timestamp("us", tz="UTC"))


def fn_random_int(n: int, seed: int | None = None, lo: int = 0,
                  hi: int = 1 << 31):
    rng = np.random.RandomState(seed)
    return pa.array(rng.randint(lo, hi, size=n), pa.int64())


def fn_range(n: int, seed: int | None = None, start: int = 0, step: int = 1):
    return pa.array(np.arange(start, start + n * step, step)[:n], pa.int64())


def fn_hostname(n: int, seed: int | None = None):
    return pa.array([socket.gethostname()] * n)


def fn_env(n: int, seed: int | None = None, name: str = ""):
    return pa.array([os.environ.get(name)] * n)


FUNCTIONS = {
    "uuid_v4": fn_uuid_v4,
    "nanoid": fn_nanoid,
    "ksuid": fn_ksuid,
    "now": fn_now,
    "random_int": fn_random_int,
    "range": fn_range,
    "hostname": fn_hostname,
    "env": fn_env,
}


# --------------------------------------------------------------------------
# METHODS — strings
# --------------------------------------------------------------------------

def _xxh64_impl():
    """True XXH64 of the value bytes: system libxxhash via ctypes when
    present, else the spec-validated pure-Python fallback
    (functions/xxh.py). Both verified identical against libxxhash."""
    try:
        import ctypes

        lib = ctypes.CDLL("libxxhash.so.0")
        lib.XXH64.restype = ctypes.c_uint64
        lib.XXH64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.c_uint64]
        return lambda b: lib.XXH64(b, len(b), 0)
    except OSError:
        from bento_ray.functions.xxh import xxhash64

        return lambda b: xxhash64(b, 0)


_XXH64 = None


def m_hash(col, algorithm: str = "sha256"):
    if algorithm == "xxhash64":
        # Reference parity (methods_strings.go:852-857): decimal string
        # of the true XXH64 digest.
        global _XXH64
        if _XXH64 is None:
            _XXH64 = _xxh64_impl()
        xx = _XXH64
        return _pyloop(col, lambda s: str(
            xx(s.encode() if isinstance(s, str) else bytes(s))))
    if algorithm == "crc32":
        # IEEE polynomial (the reference default, methods_strings.go:863)
        return _pyloop(col, lambda s: str(binascii.crc32(
            s.encode() if isinstance(s, str) else bytes(s)) & 0xFFFFFFFF))
    algo = {"sha256": hashlib.sha256, "sha512": hashlib.sha512,
            "sha1": hashlib.sha1, "md5": hashlib.md5}[algorithm]
    return _pyloop(col, lambda s: algo(
        s.encode() if isinstance(s, str) else s).hexdigest())


def m_encode(col, scheme: str = "base64"):
    def enc(s):
        b = s.encode() if isinstance(s, str) else bytes(s)
        if scheme == "base64":
            return base64.b64encode(b).decode()
        if scheme == "base64url":
            return base64.urlsafe_b64encode(b).decode()
        if scheme == "hex":
            return binascii.hexlify(b).decode()
        if scheme == "ascii85":
            return base64.a85encode(b).decode()
        raise ValueError(scheme)
    return _pyloop(col, enc)


def m_decode(col, scheme: str = "base64"):
    def dec(s):
        if scheme == "base64":
            return base64.b64decode(s)
        if scheme == "base64url":
            return base64.urlsafe_b64decode(s)
        if scheme == "hex":
            return binascii.unhexlify(s)
        if scheme == "ascii85":
            return base64.a85decode(s)
        raise ValueError(scheme)
    return _pyloop(col, dec, pa.binary())


_SLUG_RE = re.compile(r"[^a-z0-9]+")


METHODS = {
    # strings — methods_strings.go
    "uppercase": lambda c: pc.utf8_upper(c),
    "lowercase": lambda c: pc.utf8_lower(c),
    "capitalize": lambda c: pc.utf8_capitalize(c),
    "trim": lambda c, chars=None: (pc.utf8_trim_whitespace(c) if chars is None
                                   else pc.utf8_trim(c, characters=chars)),
    "trim_prefix": lambda c, p: _pyloop(c, lambda s: s[len(p):] if s.startswith(p) else s),
    "trim_suffix": lambda c, p: _pyloop(c, lambda s: s[:-len(p)] if p and s.endswith(p) else s),
    "has_prefix": lambda c, p: pc.starts_with(c, pattern=p),
    "has_suffix": lambda c, p: pc.ends_with(c, pattern=p),
    "contains": lambda c, sub: pc.match_substring(c, pattern=sub),
    "index_of": lambda c, sub: pc.find_substring(c, pattern=sub),
    "length": lambda c: (pc.list_value_length(c)
                         if pa.types.is_list(_as_array(c).type)
                         else pc.utf8_length(c)),
    "replace_all": lambda c, a, b: pc.replace_substring(c, pattern=a, replacement=b),
    "re_match": lambda c, p: pc.match_substring_regex(c, pattern=p),
    "re_replace_all": lambda c, p, r: pc.replace_substring_regex(c, pattern=p, replacement=r),
    "re_find_all": lambda c, p: pc.extract_regex_span(c, pattern=p)
        if hasattr(pc, "extract_regex_span")
        else _pyloop(c, lambda s: re.findall(p, s), pa.list_(pa.string())),
    "split": lambda c, sep: pc.split_pattern(c, pattern=sep),
    "join": lambda c, sep: pc.binary_join(c, sep),
    "repeat": lambda c, n: pc.binary_repeat(c, n),
    "reverse": lambda c: (pc.list_slice(c, 0, None, -1)
                          if pa.types.is_list(_as_array(c).type)
                          else pc.utf8_reverse(c)),
    "slice": lambda c, start, stop=None: pc.utf8_slice_codeunits(c, start, stop),
    "string": lambda c: pc.cast(c, pa.string()),
    "bytes": lambda c: pc.cast(c, pa.binary()),
    "number": lambda c: pc.cast(c, pa.float64()),
    "bool": lambda c: pc.cast(c, pa.bool_()),
    "quote": lambda c: _pyloop(c, lambda s: json.dumps(s)),
    "unquote": lambda c: _pyloop(c, lambda s: json.loads(s)),
    "slug": lambda c: _pyloop(c, lambda s: _SLUG_RE.sub("-", s.lower()).strip("-")),
    "strip_html": lambda c: _pyloop(c, strip_html),
    "escape_html": lambda c: _pyloop(c, go_escape),
    "unescape_html": lambda c: _pyloop(c, lambda s: __import__("html").unescape(s)),
    "escape_url_query": lambda c: _pyloop(c, urllib.parse.quote_plus),
    "unescape_url_query": lambda c: _pyloop(c, urllib.parse.unquote_plus),
    "parse_json": lambda c: _pyloop(c, json.loads),
    "format_json": lambda c: _pyloop(c, lambda v: json.dumps(
        v, separators=(",", ":"))),
    "parse_url": lambda c: _pyloop(c, lambda s: dict(zip(
        ("scheme", "host", "path", "query", "fragment"),
        (lambda u: (u.scheme, u.netloc, u.path, u.query, u.fragment))(
            urllib.parse.urlparse(s))))),
    "filepath_join": lambda c: _pyloop(c, lambda parts: os.path.join(*parts)),
    "filepath_split": lambda c: _pyloop(
        c, lambda s: list(os.path.split(s)), pa.list_(pa.string())),
    "hash": m_hash,
    "encode": m_encode,
    "decode": m_decode,
    # numbers — methods_numbers.go + bloblang_numbers
    "ceil": lambda c: pc.ceil(c),
    "floor": lambda c: pc.floor(c),
    "round": lambda c: pc.round(c),
    "abs": lambda c: pc.abs(c),
    "log": lambda c: pc.ln(c),
    "log10": lambda c: pc.log10(c),
    "sqrt": lambda c: pc.sqrt(c),
    "pow": lambda c, e: pc.power(c, e),
    "min": lambda c, other: pc.min_element_wise(c, other),
    "max": lambda c, other: pc.max_element_wise(c, other),
    "cos": lambda c: pc.cos(c),
    "sin": lambda c: pc.sin(c),
    "tan": lambda c: pc.tan(c),
    "int64": lambda c: pc.cast(c, pa.int64()),
    "int32": lambda c: pc.cast(c, pa.int32()),
    "uint64": lambda c: pc.cast(c, pa.uint64()),
    "float64": lambda c: pc.cast(c, pa.float64()),
    "float32": lambda c: pc.cast(c, pa.float32()),
    # structured — methods_structured.go (list columns)
    "sum": lambda c: _pyloop(c, lambda v: sum(v), pa.float64()),
    "unique": lambda c: _pyloop(c, lambda v: sorted(set(v))),
    "sort": lambda c: _pyloop(c, sorted),
    # per-row one-level flatten (pc.list_flatten collapses the row axis)
    "flatten": lambda c: _pyloop(c, lambda v: [
        x for sub in v for x in (sub if isinstance(sub, list) else [sub])]),
    "keys": lambda c: _pyloop(c, lambda v: sorted(v.keys()), pa.list_(pa.string())),
    "values": lambda c: _pyloop(c, lambda v: [v[k] for k in sorted(v)]),
    "append": lambda c, v: _pyloop(c, lambda x: list(x) + [v]),
    "not_empty": lambda c: pc.greater(pc.list_value_length(c), 0)
        if pa.types.is_list(_as_array(c).type)
        else pc.greater(pc.utf8_length(c), 0),
    # time — bloblang_time.go
    "ts_parse": lambda c, fmt=None: (pc.strptime(c, format=fmt, unit="us")
                                     if fmt else pc.cast(c, pa.timestamp("us"))),
    "ts_strptime": lambda c, fmt: pc.strptime(c, format=fmt, unit="us"),
    "ts_strftime": lambda c, fmt: pc.strftime(c, format=fmt),
    "ts_format": lambda c, fmt="%Y-%m-%dT%H:%M:%SZ": pc.strftime(c, format=fmt),
    "ts_round": lambda c, every_us: pa.array(
        ((_as_array(c).cast(pa.int64()).to_numpy() + every_us // 2)
         // every_us) * every_us).cast(pa.timestamp("us")),
    "ts_unix": lambda c: pc.divide(pc.cast(c, pa.int64()), 1_000_000),
    "ts_unix_milli": lambda c: pc.divide(pc.cast(c, pa.int64()), 1_000),
    "ts_unix_micro": lambda c: pc.cast(c, pa.int64()),
    "ts_unix_nano": lambda c: pc.multiply(pc.cast(c, pa.int64()), 1_000),
    # encoding/compression — bloblang_encoding.go
    "compress": lambda c, codec="gzip": _pyloop(
        c, lambda b: __import__("gzip").compress(
            b if isinstance(b, bytes) else b.encode()), pa.binary()),
    "decompress": lambda c, codec="gzip": _pyloop(
        c, lambda b: __import__("gzip").decompress(bytes(b)), pa.binary()),
}


def call(name: str, n: int, *args, **kw):
    return FUNCTIONS[name](n, *args, **kw)


def apply_method(table: pa.Table, col: str, method: str, *args,
                 out: str | None = None, **kw) -> pa.Table:
    """Apply a registered method to a column inside map_batches."""
    res = METHODS[method](table.column(col), *args, **kw)
    if isinstance(res, pa.ChunkedArray):
        res = res.combine_chunks()
    name = out or col
    if name in table.column_names:
        return table.set_column(table.column_names.index(name), name, res)
    return table.append_column(name, res)


_INTERP = re.compile(r"\$\{!?\s*([a-zA-Z_][\w.]*)\s*\}")


def interpolate(table: pa.Table, template: str) -> pa.Array:
    """Bento field interpolation (``${! expr }`` / ``${column}`` —
    internal/bloblang/field/expression.go:19-60): render a template per
    row, substituting column references. The workhorse for dedupe keys,
    cache keys and path patterns:

        interpolate(t, "${lang}:${url}")  →  StringArray

    Only column references are supported in the placeholder (the full
    method library composes via apply_method beforehand)."""
    cols = _INTERP.findall(template)
    for c in cols:
        if c not in table.column_names:
            raise KeyError(f"interpolation references unknown column {c!r}")
    parts = _INTERP.split(template)
    # parts alternate: literal, colname, literal, colname, ...
    n = len(table)
    arrays = []
    for i, piece in enumerate(parts):
        if i % 2 == 0:
            if piece:
                arrays.append(pa.array([piece] * n))
        else:
            arrays.append(pc.cast(table.column(piece), pa.string()))
    if not arrays:
        return pa.array([""] * n)
    out = arrays[0]
    for a in arrays[1:]:
        out = pc.binary_join_element_wise(out, a, "")
    return out if isinstance(out, pa.Array) else out.combine_chunks()
