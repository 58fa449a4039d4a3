"""Bloblang value model: sentinels, coercions, comparisons, Go-parity JSON.

Mirrors the reference's ``internal/value`` package semantics
(type_helpers.go): values are plain Python ``dict/list/str/bytes/
int/float/bool/None`` plus two sentinels — ``NOTHING`` (query produced
no value; assignment of it is skipped, object-literal keys carrying it
are omitted) and ``DELETE`` (explicit deletion marker from
``deleted()``).  Runtime failures raise ``BloblangError`` and are
caught by ``catch``/``or``/coalesce.
"""

from __future__ import annotations

import json
import math


class _Sentinel:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __repr__(self):
        return self.name


NOTHING = _Sentinel("Nothing")
DELETE = _Sentinel("Delete")


class BloblangError(Exception):
    """A recoverable mapping error (caught by .catch() / .or() / |)."""


def type_of(v) -> str:
    """ITypeOf (type_helpers.go:37-66)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    if v is DELETE:
        return "delete"
    if v is NOTHING:
        return "nothing"
    return "unknown"


def get_bool(v) -> bool:
    """IGetBool (type_helpers.go:202): bool, or number != 0."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return v != 0
    raise BloblangError(f"expected bool value, got {type_of(v)}")


def get_number(v) -> float:
    """IGetNumber (type_helpers.go:82): any number → float64; numeric
    strings are NOT accepted."""
    if isinstance(v, bool):
        raise BloblangError(f"expected number value, got {type_of(v)}")
    if isinstance(v, (int, float)):
        return float(v)
    raise BloblangError(f"expected number value, got {type_of(v)}")


def get_int(v) -> int:
    """IGetInt (type_helpers.go:151): ints pass; floats only if whole."""
    if isinstance(v, bool):
        raise BloblangError(f"expected int value, got {type_of(v)}")
    if isinstance(v, int):
        return v
    if isinstance(v, float):
        if v == math.floor(v) and not math.isinf(v):
            return int(v)
        raise BloblangError(f"expected int value, got float ({v})")
    raise BloblangError(f"expected int value, got {type_of(v)}")


def get_string(v) -> str:
    """IGetString (type_helpers.go:238): string or bytes only."""
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    raise BloblangError(f"expected string value, got {type_of(v)}")


def get_bytes(v) -> bytes:
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        return v.encode("utf-8")
    raise BloblangError(f"expected bytes value, got {type_of(v)}")


def restrict_for_comparison(v):
    """RestrictForComparison (type_helpers.go:311): ints → float,
    bytes → str (bool stays bool)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    return v


def icompare(left, right) -> bool:
    """ICompare (type_helpers.go:831): generic deep equality with
    cross-numeric and string/bytes unification; mismatched types are
    unequal (never an error)."""
    if left is None and right is None:
        return True
    lhs = restrict_for_comparison(left)
    if isinstance(lhs, bool):
        return isinstance(right, bool) and lhs == right
    if isinstance(lhs, str):
        try:
            return lhs == get_string(right)
        except BloblangError:
            return False
    if isinstance(lhs, float):
        try:
            return lhs == get_number(right)
        except BloblangError:
            return False
    if isinstance(lhs, list):
        if not isinstance(right, list) or len(lhs) != len(right):
            return False
        return all(icompare(a, b) for a, b in zip(lhs, right))
    if isinstance(lhs, dict):
        if not isinstance(right, dict) or set(lhs) != set(right):
            return False
        return all(icompare(lhs[k], right[k]) for k in lhs)
    return lhs is None and right is None


def is_null(v) -> bool:
    return v is None or v is NOTHING or v is DELETE


def go_float_repr(f: float) -> str:
    """Go strconv.AppendFloat(-1) shortest round-trip formatting, which
    json.Marshal uses: integral floats print without '.0'."""
    if math.isinf(f) or math.isnan(f):
        raise BloblangError("json: unsupported value: " + repr(f))
    if f == math.floor(f) and abs(f) < 1e21:
        return str(int(f))
    r = repr(f)
    # Go uses e-notation boundaries close enough to Python repr's for
    # practical mappings; normalize exponent form 1e-05 → 1e-05 (same).
    return r


class _GoJSONEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, (bytes, bytearray)):
            import base64

            return base64.b64encode(bytes(o)).decode()
        return super().default(o)


def _go_encode(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_float_repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, (bytes, bytearray)):
        import base64

        return json.dumps(base64.b64encode(bytes(v)).decode())
    if isinstance(v, list):
        return "[" + ",".join(_go_encode(x) for x in v
                              if x is not NOTHING and x is not DELETE) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), val) for k, val in v.items()
                       if val is not NOTHING and val is not DELETE)
        return "{" + ",".join(
            json.dumps(k, ensure_ascii=False) + ":" + _go_encode(val)
            for k, val in items) + "}"
    raise BloblangError(f"cannot marshal {type_of(v)}")


def go_json_dumps(v) -> str:
    """Compact JSON with Go ``json.Marshal`` conventions: sorted object
    keys, integral floats without '.0', bytes as base64."""
    return _go_encode(v)


def parse_json_arg(s):
    """JSON parse keeping int/float distinction like Go's
    UseNumber+ISanitize path (ints stay ints)."""
    return json.loads(s)


def clone(v):
    """IClone: deep copy of containers (assignment isolates values)."""
    if isinstance(v, dict):
        return {k: clone(x) for k, x in v.items()}
    if isinstance(v, list):
        return [clone(x) for x in v]
    return v
