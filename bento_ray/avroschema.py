"""Pure-Python Avro serde — schema parsing, binary / Avro-JSON codecs,
single-object encoding and OCF container reading.

Mirrors the semantics the reference gets from linkedin/goavro
(internal/impl/avro/processor.go: operators ``to_json`` / ``from_json``
over ``textual`` / ``binary`` / ``single`` encodings;
internal/impl/avro/scanner.go: OCF stream → Avro-JSON documents, with
an ``avro_raw_json`` standard-JSON mode). No avro library exists in
this sandbox, so the wire formats are implemented from the public Avro
1.11 specification directly:

- binary: zigzag-varint ints/longs, little-endian IEEE floats,
  long-prefixed bytes/strings, index-prefixed unions, block-encoded
  arrays/maps (negative block counts carry a byte size);
- Avro JSON: union values wrap as ``{"<branch name>": value}`` (null
  stays bare); bytes/fixed map through ISO-8859-1 strings;
- single-object: ``C3 01`` magic + 8-byte little-endian CRC-64-AVRO
  fingerprint of the Parsing Canonical Form + binary payload;
- OCF: ``Obj\\x01`` magic, metadata map, 16-byte sync, blocks with
  ``null`` / ``deflate`` / ``snappy`` codecs (snappy block + CRC32 via compression.py).

Native value convention matches goavro: decoded unions are wrapped
``{branch: value}`` maps so round-trips are lossless; ``raw_json``
mode unwraps (and re-infers on encode) like goavro's
NewCodecForStandardJSONFull.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
              "bytes", "string"}

_INT_MIN, _INT_MAX = -(1 << 31), (1 << 31) - 1
_LONG_MIN, _LONG_MAX = -(1 << 63), (1 << 63) - 1


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# schema model
# ---------------------------------------------------------------------------

class Schema:
    """One node of a parsed schema tree. ``type`` is the Avro type name;
    named types carry ``fullname``; unions carry ``branches``."""

    __slots__ = ("type", "fullname", "fields", "symbols", "items",
                 "values", "size", "branches", "logical")

    def __init__(self, type_: str):
        self.type = type_
        self.fullname = None
        self.fields = None      # record: list[(name, Schema, has_default, default)]
        self.symbols = None     # enum
        self.items = None       # array
        self.values = None      # map
        self.size = None        # fixed
        self.branches = None    # union: list[Schema]
        self.logical = None

    @property
    def name(self) -> str:
        """Union-branch / Avro-JSON key name: fullname for named types,
        the type keyword otherwise (spec: JSON encoding of unions)."""
        return self.fullname if self.fullname else self.type


def _fullname(name: str, namespace: str | None) -> str:
    if "." in name or not namespace:
        return name
    return f"{namespace}.{name}"


def parse_schema(src, _names: dict | None = None,
                 _namespace: str | None = None) -> Schema:
    """Parse a schema from JSON text / parsed JSON. Named types register
    in ``_names`` and may be referenced by (full)name afterwards."""
    if _names is None:
        _names = {}
    if isinstance(src, (str, bytes)) and not (
            isinstance(src, str) and src in PRIMITIVES):
        try:
            src = json.loads(src)
        except json.JSONDecodeError as e:
            raise AvroError(f"failed to parse schema: {e}") from None
    if isinstance(src, str):
        if src in PRIMITIVES:
            return Schema(src)
        ref = _fullname(src, _namespace)
        if ref in _names:
            return _names[ref]
        if src in _names:
            return _names[src]
        raise AvroError(f"unknown type reference: {src}")
    if isinstance(src, list):
        s = Schema("union")
        s.branches = [parse_schema(b, _names, _namespace) for b in src]
        return s
    if not isinstance(src, dict):
        raise AvroError(f"invalid schema node: {src!r}")

    t = src.get("type")
    if isinstance(t, (list, dict)):
        return parse_schema(t, _names, _namespace)
    if t in PRIMITIVES:
        s = Schema(t)
        s.logical = src.get("logicalType")
        return s
    if t in ("record", "error", "enum", "fixed"):
        ns = src.get("namespace", _namespace)
        name = src["name"]
        if "." in name:
            ns = name.rsplit(".", 1)[0]
        s = Schema("record" if t == "error" else t)
        s.fullname = _fullname(name, ns)
        _names[s.fullname] = s
        if t == "enum":
            s.symbols = list(src["symbols"])
        elif t == "fixed":
            s.size = int(src["size"])
            s.logical = src.get("logicalType")
        else:
            s.fields = []
            for f in src["fields"]:
                fs = parse_schema(f["type"], _names, ns)
                s.fields.append((f["name"], fs, "default" in f,
                                 f.get("default")))
        return s
    if t == "array":
        s = Schema("array")
        s.items = parse_schema(src["items"], _names, _namespace)
        return s
    if t == "map":
        s = Schema("map")
        s.values = parse_schema(src["values"], _names, _namespace)
        return s
    if isinstance(t, str):
        # type reference spelled as {"type": "SomeName"}
        return parse_schema(t, _names, _namespace)
    raise AvroError(f"invalid schema type: {t!r}")


# ---------------------------------------------------------------------------
# binary codec
# ---------------------------------------------------------------------------

def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        c = buf.read(1)
        if not c:
            raise AvroError("truncated varint")
        b = c[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise AvroError("varint too long")
    return (acc >> 1) ^ -(acc & 1)


def _union_branch(schema: Schema, value):
    """Resolve (branch index, branch schema, unwrapped value) for a
    union encode. Accepts goavro-style ``{name: v}`` wrapping (full or
    short name) and falls back to type inference for bare values."""
    branches = schema.branches
    if value is None:
        for i, b in enumerate(branches):
            if b.type == "null":
                return i, b, None
        raise AvroError("union has no null branch for None")
    if isinstance(value, dict) and len(value) == 1:
        (key, inner), = value.items()
        for i, b in enumerate(branches):
            if b.name == key or (b.fullname
                                 and b.fullname.rsplit(".", 1)[-1] == key):
                return i, b, inner
    for i, b in enumerate(branches):
        if _accepts(b, value):
            return i, b, value
    raise AvroError(f"no union branch matches value {value!r}")


def _accepts(s: Schema, v) -> bool:
    t = s.type
    if t == "null":
        return v is None
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t in ("bytes", "fixed"):
        return isinstance(v, (bytes, bytearray))
    if t == "enum":
        return isinstance(v, str) and v in s.symbols
    if t == "array":
        return isinstance(v, list)
    if t in ("map", "record"):
        return isinstance(v, dict)
    if t == "union":
        try:
            _union_branch(s, v)
            return True
        except AvroError:
            return False
    return False


def encode_binary(schema: Schema, value, out: io.BytesIO | None = None) -> bytes:
    top = out is None
    if out is None:
        out = io.BytesIO()
    t = schema.type
    if t == "null":
        if value is not None:
            raise AvroError(f"expected null, got {value!r}")
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        v = int(value)
        lo, hi = (_INT_MIN, _INT_MAX) if t == "int" else (_LONG_MIN, _LONG_MAX)
        if not lo <= v <= hi:
            raise AvroError(f"{t} out of range: {v}")
        _write_long(out, v)
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t in ("bytes", "string"):
        # 'bytes' values arriving as str use the Avro-JSON ISO-8859-1
        # convention (one char per byte — same as 'fixed' below and
        # decode_textual); utf-8 would double every byte >0x7F and
        # break textual→binary transcoding. 'string' stays utf-8.
        if isinstance(value, str):
            data = value.encode("utf-8") if t == "string" \
                else value.encode("ISO-8859-1")
        else:
            data = bytes(value)
        _write_long(out, len(data))
        out.write(data)
    elif t == "fixed":
        data = value.encode("ISO-8859-1") if isinstance(value, str) else bytes(value)
        if len(data) != schema.size:
            raise AvroError(
                f"fixed {schema.fullname}: got {len(data)} bytes, "
                f"want {schema.size}")
        out.write(data)
    elif t == "enum":
        try:
            _write_long(out, schema.symbols.index(value))
        except ValueError:
            raise AvroError(
                f"value {value!r} not in enum {schema.fullname}") from None
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                encode_binary(schema.items, item, out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                kb = k.encode("utf-8")
                _write_long(out, len(kb))
                out.write(kb)
                encode_binary(schema.values, v, out)
        _write_long(out, 0)
    elif t == "record":
        if not isinstance(value, dict):
            raise AvroError(f"record {schema.fullname}: expected object, "
                            f"got {type(value).__name__}")
        for name, fs, has_default, default in schema.fields:
            if name in value:
                fv = value[name]
            elif has_default:
                fv = _default_native(fs, default)
            else:
                raise AvroError(
                    f"record {schema.fullname}: missing field {name!r}")
            encode_binary(fs, fv, out)
    elif t == "union":
        idx, branch, inner = _union_branch(schema, value)
        _write_long(out, idx)
        encode_binary(branch, inner, out)
    else:
        raise AvroError(f"cannot encode type {t}")
    return out.getvalue() if top else b""


def _default_native(s: Schema, default):
    """Defaults in schema JSON use the Avro-JSON value space; for union
    fields the default always matches the FIRST branch (spec)."""
    if s.type == "union":
        return _from_avro_json(s.branches[0], default)
    return _from_avro_json(s, default)


def decode_binary(schema: Schema, data: bytes | io.BytesIO):
    buf = data if isinstance(data, io.BytesIO) else io.BytesIO(data)
    value = _decode(schema, buf)
    if not isinstance(data, io.BytesIO) and buf.read(1):
        raise AvroError("trailing bytes after Avro document")
    return value


def _decode(schema: Schema, buf: io.BytesIO):
    t = schema.type
    if t == "null":
        return None
    if t == "boolean":
        c = buf.read(1)
        if not c:
            raise AvroError("truncated boolean")
        return c == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", _take(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _take(buf, 8))[0]
    if t == "bytes":
        return _take(buf, _read_long(buf))
    if t == "string":
        return _take(buf, _read_long(buf)).decode("utf-8")
    if t == "fixed":
        return _take(buf, schema.size)
    if t == "enum":
        idx = _read_long(buf)
        if not 0 <= idx < len(schema.symbols):
            raise AvroError(f"enum index {idx} out of range")
        return schema.symbols[idx]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)  # byte size of the block — skippable info
            for _ in range(n):
                out.append(_decode(schema.items, buf))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _take(buf, _read_long(buf)).decode("utf-8")
                out[k] = _decode(schema.values, buf)
    if t == "record":
        return {name: _decode(fs, buf)
                for name, fs, _, _ in schema.fields}
    if t == "union":
        idx = _read_long(buf)
        if not 0 <= idx < len(schema.branches):
            raise AvroError(f"union index {idx} out of range")
        branch = schema.branches[idx]
        v = _decode(branch, buf)
        if branch.type == "null":
            return None
        return {branch.name: v}
    raise AvroError(f"cannot decode type {t}")


def _take(buf: io.BytesIO, n: int) -> bytes:
    if n < 0:
        raise AvroError("negative length")
    data = buf.read(n)
    if len(data) != n:
        raise AvroError("truncated Avro document")
    return data


# ---------------------------------------------------------------------------
# Avro-JSON (textual) codec
# ---------------------------------------------------------------------------

def decode_textual(schema: Schema, text: str | bytes):
    """Avro-JSON text → native (unions stay wrapped, like goavro
    NativeFromTextual)."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise AvroError(f"invalid JSON: {e}") from None
    return _from_avro_json(schema, doc)


def _from_avro_json(schema: Schema, v):
    t = schema.type
    if t == "null":
        if v is not None:
            raise AvroError(f"expected null, got {v!r}")
        return None
    if t == "boolean":
        if not isinstance(v, bool):
            raise AvroError(f"expected boolean, got {v!r}")
        return v
    if t in ("int", "long"):
        if isinstance(v, bool) or not isinstance(v, int):
            raise AvroError(f"expected {t}, got {v!r}")
        return v
    if t in ("float", "double"):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise AvroError(f"expected {t}, got {v!r}")
        return float(v)
    if t == "string":
        if not isinstance(v, str):
            raise AvroError(f"expected string, got {v!r}")
        return v
    if t in ("bytes", "fixed"):
        if not isinstance(v, str):
            raise AvroError(f"expected bytes-string, got {v!r}")
        return v.encode("ISO-8859-1")
    if t == "enum":
        if v not in schema.symbols:
            raise AvroError(f"value {v!r} not in enum")
        return v
    if t == "array":
        return [_from_avro_json(schema.items, x) for x in v]
    if t == "map":
        return {k: _from_avro_json(schema.values, x) for k, x in v.items()}
    if t == "record":
        if not isinstance(v, dict):
            raise AvroError(f"expected object, got {v!r}")
        out = {}
        for name, fs, has_default, default in schema.fields:
            if name in v:
                out[name] = _from_avro_json(fs, v[name])
            elif has_default:
                out[name] = _default_native(fs, default)
            else:
                raise AvroError(f"missing field {name!r}")
        return out
    if t == "union":
        if v is None:
            for b in schema.branches:
                if b.type == "null":
                    return None
            raise AvroError("union has no null branch")
        if not (isinstance(v, dict) and len(v) == 1):
            raise AvroError(f"union value must be single-key object, "
                            f"got {v!r}")
        (key, inner), = v.items()
        for b in schema.branches:
            if b.name == key or (b.fullname
                                 and b.fullname.rsplit(".", 1)[-1] == key):
                return {b.name: _from_avro_json(b, inner)}
        raise AvroError(f"unknown union branch {key!r}")
    raise AvroError(f"cannot decode type {t}")


def encode_textual(schema: Schema, value) -> str:
    """Native → Avro-JSON text (goavro TextualFromNative shape:
    compact separators, record fields in schema order)."""
    return json.dumps(_to_avro_json(schema, value),
                      separators=(",", ":"), ensure_ascii=False)


def _to_avro_json(schema: Schema, v):
    t = schema.type
    if t in ("null", "boolean", "int", "long", "string", "enum"):
        return v
    if t in ("float", "double"):
        return float(v)
    if t in ("bytes", "fixed"):
        data = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
        return bytes(data).decode("ISO-8859-1")
    if t == "array":
        return [_to_avro_json(schema.items, x) for x in v]
    if t == "map":
        return {k: _to_avro_json(schema.values, x) for k, x in v.items()}
    if t == "record":
        out = {}
        for name, fs, has_default, default in schema.fields:
            if name in v:
                fv = v[name]
            elif has_default:
                fv = _default_native(fs, default)
            else:
                raise AvroError(f"missing field {name!r}")
            out[name] = _to_avro_json(fs, fv)
        return out
    if t == "union":
        idx, branch, inner = _union_branch(schema, v)
        if branch.type == "null":
            return None
        return {branch.name: _to_avro_json(branch, inner)}
    raise AvroError(f"cannot encode type {t}")


# ---------------------------------------------------------------------------
# raw/standard JSON mode (goavro NewCodecForStandardJSONFull): unions
# unwrapped on decode, inferred on encode
# ---------------------------------------------------------------------------

def unwrap_unions(schema: Schema, v):
    t = schema.type
    if t == "union":
        if v is None:
            return None
        if isinstance(v, dict) and len(v) == 1:
            (key, inner), = v.items()
            for b in schema.branches:
                if b.name == key:
                    return unwrap_unions(b, inner)
        return v
    if t == "array":
        return [unwrap_unions(schema.items, x) for x in v]
    if t == "map":
        return {k: unwrap_unions(schema.values, x) for k, x in v.items()}
    if t == "record":
        return {name: unwrap_unions(fs, v[name])
                for name, fs, _, _ in schema.fields if name in v}
    return v


# ---------------------------------------------------------------------------
# single-object encoding (spec: C3 01 + CRC-64-AVRO of canonical form)
# ---------------------------------------------------------------------------

_CRC64_EMPTY = 0xC15D213AA4D7A795
_crc64_table: list[int] | None = None


def _crc64_avro(data: bytes) -> int:
    global _crc64_table
    if _crc64_table is None:
        table = []
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_CRC64_EMPTY & -(fp & 1))
            table.append(fp)
        _crc64_table = table
    fp = _CRC64_EMPTY
    for b in data:
        fp = (fp >> 8) ^ _crc64_table[(fp ^ b) & 0xFF]
    return fp


def canonical_form(schema: Schema) -> str:
    """Parsing Canonical Form (spec §Schema Fingerprints): fullnames,
    fixed attribute order, no defaults/docs/aliases, no whitespace."""
    t = schema.type
    if t in PRIMITIVES:
        return f'"{t}"'
    if t == "union":
        return "[" + ",".join(canonical_form(b)
                              for b in schema.branches) + "]"
    if t == "array":
        return ('{"type":"array","items":'
                + canonical_form(schema.items) + "}")
    if t == "map":
        return ('{"type":"map","values":'
                + canonical_form(schema.values) + "}")
    name = json.dumps(schema.fullname)
    if t == "enum":
        return ('{"name":%s,"type":"enum","symbols":[%s]}'
                % (name, ",".join(json.dumps(s) for s in schema.symbols)))
    if t == "fixed":
        return ('{"name":%s,"type":"fixed","size":%d}'
                % (name, schema.size))
    if t == "record":
        fields = ",".join(
            '{"name":%s,"type":%s}' % (json.dumps(n), canonical_form(fs))
            for n, fs, _, _ in schema.fields)
        return ('{"name":%s,"type":"record","fields":[%s]}'
                % (name, fields))
    raise AvroError(f"cannot canonicalize type {t}")


def schema_fingerprint(schema: Schema) -> bytes:
    return struct.pack(
        "<Q", _crc64_avro(canonical_form(schema).encode("utf-8")))


_SINGLE_MAGIC = b"\xc3\x01"


def encode_single(schema: Schema, value) -> bytes:
    return (_SINGLE_MAGIC + schema_fingerprint(schema)
            + encode_binary(schema, value))


def decode_single(schema: Schema, data: bytes):
    if data[:2] != _SINGLE_MAGIC:
        raise AvroError("missing single-object magic C3 01")
    if data[2:10] != schema_fingerprint(schema):
        raise AvroError("schema fingerprint mismatch")
    return decode_binary(schema, data[10:])


# ---------------------------------------------------------------------------
# OCF (object container file)
# ---------------------------------------------------------------------------

_OCF_MAGIC = b"Obj\x01"
_META_SCHEMA = parse_schema(
    {"type": "map", "values": "bytes"})


def read_ocf(data: bytes):
    """Yield native values from an OCF payload; ``.schema`` /
    ``.codec`` available on the returned iterator object."""
    buf = io.BytesIO(data)
    if buf.read(4) != _OCF_MAGIC:
        raise AvroError("not an Avro OCF (bad magic)")
    meta = _decode(_META_SCHEMA, buf)
    schema_json = meta.get("avro.schema")
    if schema_json is None:
        raise AvroError("OCF missing avro.schema")
    schema = parse_schema(schema_json.decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = _take(buf, 16)

    def _values():
        while buf.tell() < len(data):
            count = _read_long(buf)
            size = _read_long(buf)
            block = _take(buf, size)
            if codec == "null":
                pass
            elif codec == "deflate":
                block = zlib.decompress(block, wbits=-15)
            elif codec == "snappy":
                # Avro spec: snappy BLOCK format + 4-byte big-endian
                # CRC32 (IEEE, zlib.crc32) of the uncompressed data
                from bento_ray import compression as _cz

                if len(block) < 4:
                    raise AvroError("snappy OCF block too short")
                want = int.from_bytes(block[-4:], "big")
                block = _cz.snappy_block_decompress(block[:-4])
                if zlib.crc32(block) & 0xFFFFFFFF != want:
                    raise AvroError("snappy OCF block CRC mismatch")
            else:
                raise AvroError(f"unsupported OCF codec: {codec}")
            bbuf = io.BytesIO(block)
            for _ in range(count):
                yield _decode(schema, bbuf)
            if _take(buf, 16) != sync:
                raise AvroError("OCF sync marker mismatch")

    class _Iter:
        pass

    it = _Iter()
    it.schema = schema
    it.codec = codec
    it.values = _values
    return it


def write_ocf(schema: Schema, schema_json: str, values,
              codec: str = "null",
              sync: bytes = b"\x00" * 16) -> bytes:
    """Minimal OCF writer (deterministic sync by default) — used by
    tests and the generate surface; one block for all values."""
    out = io.BytesIO()
    out.write(_OCF_MAGIC)
    encode_binary(_META_SCHEMA, {
        "avro.schema": schema_json.encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }, out)
    out.write(sync)
    block = io.BytesIO()
    n = 0
    for v in values:
        encode_binary(schema, v, block)
        n += 1
    payload = block.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        payload = co.compress(payload) + co.flush()
    elif codec == "snappy":
        from bento_ray import compression as _cz

        crc = (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "big")
        payload = _cz.snappy_block_compress(payload) + crc
    elif codec != "null":
        raise AvroError(f"unsupported OCF write codec: {codec}")
    _write_long(out, n)
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    return out.getvalue()
