"""Bloblang method registry (scalar, per-value).

Reference registries: internal/bloblang/query/methods.go,
methods_strings.go, methods_numbers.go, methods_structured.go.

Two dispatch classes:
- AST methods (``_AST_METHODS``) receive the *unevaluated* target /
  argument ASTs — context-rebinding iterators (map_each, filter, fold,
  sort_by…), error handlers (catch, or), batch accessors (from,
  from_all) and map application (apply).
- value methods (the big ``dispatch`` chain) receive evaluated values.
"""

from __future__ import annotations

import base64
import binascii
import datetime
import hashlib
import html as _html
import json
import math
import re
import urllib.parse
import zlib

from bento_ray.blobl.values import (
    DELETE, NOTHING, BloblangError, get_bool, get_bytes, get_int,
    get_number, get_string, go_float_repr, go_json_dumps, icompare,
    is_null, type_of,
)

# ---------------------------------------------------------------- helpers


def _as_str(v):
    return get_string(v)


def _elem_eval(argq, ctx, elem, ev):
    """Evaluate a per-element query argument: lambdas capture the
    element under their parameter name (outer ``this`` preserved,
    NamedContextFunction semantics); plain queries see the element as
    ``this``."""
    if argq[0] == "lambda":
        c = ctx.with_named(argq[1], elem)
        return ev(argq[2], c)
    return ev(argq, ctx.with_value(elem))


def _go_regex(pattern: str) -> str:
    """Go RE2 → Python re translation for the common cases."""
    return pattern


def _go_template(repl: str) -> str:
    """Go Regexp.ReplaceAllString template → Python: ``$1`` → ``\\1``,
    ``${name}`` → ``\\g<name>``, ``$$`` → ``$``."""
    out = []
    i = 0
    while i < len(repl):
        c = repl[i]
        if c == "\\":
            out.append("\\\\")
            i += 1
        elif c == "$":
            if i + 1 < len(repl) and repl[i + 1] == "$":
                out.append("$")
                i += 2
            elif i + 1 < len(repl) and repl[i + 1] == "{":
                j = repl.index("}", i)
                out.append(f"\\g<{repl[i + 2:j]}>")
                i = j + 1
            else:
                j = i + 1
                while j < len(repl) and (repl[j].isalnum() or repl[j] == "_"):
                    j += 1
                name = repl[i + 1:j]
                if name == "":
                    out.append("$")
                    i += 1
                elif name.isdigit():
                    out.append(f"\\{int(name)}")
                    i = j
                else:
                    out.append(f"\\g<{name}>")
                    i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


_GO_LAYOUT_MAP = [
    ("2006", "%Y"), ("01", "%m"), ("02", "%d"), ("15", "%H"),
    ("03", "%I"), ("04", "%M"), ("05", "%S"), (".999999999", ""),
    (".999999", ""), (".999", ""), ("999999999", ""),
    ("Jan", "%b"), ("January", "%B"), ("Mon", "%a"), ("Monday", "%A"),
    ("PM", "%p"), ("pm", "%p"), ("-07:00", "%:z"), ("-0700", "%z"),
    ("Z07:00", "%:z"), ("MST", "%Z"), ("06", "%y"), ("1", "%-m"),
    ("2", "%-d"), ("3", "%-I"),
]


def _parse_ts(v, layout: str | None = None):
    """Parse a timestamp value (string RFC3339 / unix number) into an
    aware datetime."""
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return datetime.datetime.fromtimestamp(
            float(v), tz=datetime.timezone.utc)
    s = get_string(v)
    s2 = s.replace("Z", "+00:00") if s.endswith("Z") else s
    try:
        dt = datetime.datetime.fromisoformat(s2)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return dt
    except ValueError:
        raise BloblangError(f"cannot parse timestamp {s!r}")


def _format_rfc3339(dt: datetime.datetime) -> str:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    off = dt.utcoffset()
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        base += ("%.9f" % (dt.microsecond / 1e6))[1:].rstrip("0")
    if off == datetime.timedelta(0):
        return base + "Z"
    return base + dt.strftime("%z")[:3] + ":" + dt.strftime("%z")[3:]


def _ito_string(v) -> str:
    """IToString: value → string the way Go does (query/methods.go
    string method)."""
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return go_float_repr(v)
    if isinstance(v, int):
        return str(v)
    if v is None:
        return "null"
    return go_json_dumps(v)


def _deep_merge(dest, src):
    """Bento merge semantics (methods_structured.go merge): object keys
    combine recursively; colliding non-object values become arrays."""
    if isinstance(dest, dict) and isinstance(src, dict):
        out = dict(dest)
        for k, v in src.items():
            if k in out:
                out[k] = _deep_merge(out[k], v)
            else:
                out[k] = v
        return out
    if isinstance(dest, list):
        return dest + (src if isinstance(src, list) else [src])
    if isinstance(src, list):
        return [dest] + src
    return [dest, src]


def _parse_duration(s: str) -> int:
    """Go time.ParseDuration → nanoseconds."""
    units = {"ns": 1, "us": 1_000, "µs": 1_000, "ms": 1_000_000,
             "s": 1_000_000_000, "m": 60_000_000_000,
             "h": 3_600_000_000_000}
    m = re.findall(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)", s)
    if not m:
        raise BloblangError(f"invalid duration {s!r}")
    total = 0.0
    neg = s.strip().startswith("-")
    for num, unit in m:
        total += float(num) * units[unit]
    return int(-total if neg else total)


def _parse_iso8601_duration(s: str) -> float:
    """ISO-8601 duration → seconds."""
    m = re.fullmatch(
        r"P(?:(\d+(?:\.\d+)?)Y)?(?:(\d+(?:\.\d+)?)M)?(?:(\d+(?:\.\d+)?)W)?"
        r"(?:(\d+(?:\.\d+)?)D)?"
        r"(?:T(?:(\d+(?:\.\d+)?)H)?(?:(\d+(?:\.\d+)?)M)?"
        r"(?:(\d+(?:\.\d+)?)S)?)?", s)
    if not m or s == "P":
        raise BloblangError(f"invalid ISO-8601 duration {s!r}")
    y, mo, w, d, h, mi, sec = (float(x) if x else 0.0 for x in m.groups())
    return (y * 31536000 + mo * 2592000 + w * 604800 + d * 86400 +
            h * 3600 + mi * 60 + sec)


def _xml_cast(s: str):
    if re.fullmatch(r"[+-]?\d+", s):
        return int(s)
    try:
        return float(s)
    except ValueError:
        pass
    if s in ("true", "True", "TRUE"):
        return True
    if s in ("false", "False", "FALSE"):
        return False
    return s


def _xml_elem_to_value(elem, cast: bool):
    """mxj.NewMapXml conventions (internal/impl/xml/package.go +
    parse_xml docs): attributes keyed ``-name``, simple-element text
    under ``#text`` when attributes exist, repeated elements become
    arrays, comments/PIs ignored."""
    obj: dict = {}
    for k, v in elem.attrib.items():
        obj["-" + k] = _xml_cast(v) if cast else v
    children = list(elem)
    text = (elem.text or "").strip()
    if not children:
        val = _xml_cast(text) if cast and text else text
        if obj:
            if text:
                obj["#text"] = val
            return obj
        return val
    for child in children:
        cv = _xml_elem_to_value(child, cast)
        tag = child.tag
        if tag in obj:
            if not isinstance(obj[tag], list):
                obj[tag] = [obj[tag]]
            obj[tag].append(cv)
        else:
            obj[tag] = cv
    return obj


_XML_BARE_ATTR = re.compile(r'(\s[A-Za-z_][\w.-]*)=([^\s"\'>/][^\s>/]*)')


def m_parse_xml(v, cast=False):
    """parse_xml (internal/impl/xml/bloblang.go:13-56). Well-formed XML
    parses directly; only when strict parsing fails is the non-strict
    bare-attribute pre-pass applied (the reference's decoder accepts
    unquoted attribute values) — applying it unconditionally corrupted
    '=' sequences inside element TEXT."""
    import xml.etree.ElementTree as ET

    s = get_string(v)
    try:
        root = ET.fromstring(s)
    except ET.ParseError:
        try:
            root = ET.fromstring(_XML_BARE_ATTR.sub(r'\1="\2"', s))
        except ET.ParseError as e:
            raise BloblangError(f"failed to parse value as XML: {e}")
    return {root.tag: _xml_elem_to_value(root, bool(cast))}


# ------------------------------------------------------------ AST methods

_AST_METHODS = {"catch", "or", "from", "from_all", "apply", "map_each",
                "map_each_key", "filter", "sort", "sort_by", "fold",
                "any", "all", "find", "find_all", "find_by",
                "find_all_by", "split_by", "map"}


def _annotate(node) -> str | None:
    """Source annotation used in type-error messages
    (functions.go:36-47): ``field `this.a.b```."""
    if node[0] == "context":
        base, segs = node[1], node[2]
        if base == "this":
            path = "this" + "".join(f".{s}" for s in segs)
            return f"field `{path}`"
        if base == "root":
            return "field `root" + "".join(f".{s}" for s in segs) + "`"
        if isinstance(base, tuple) and base[0] == "var":
            return f"variable `{base[1]}`"
    return None


def call_method(target_q, name, arg_qs, kwarg_qs, ctx, ev):
    if name in _AST_METHODS:
        return _call_ast_method(target_q, name, arg_qs, kwarg_qs, ctx, ev)
    target = ev(target_q, ctx)
    args = [ev(q, ctx) for q in arg_qs]
    kwargs = {k: ev(q, ctx) for k, q in kwarg_qs.items()}
    try:
        return dispatch(name, target, args, kwargs, ctx)
    except BloblangError as e:
        msg = str(e)
        ann = _annotate(target_q)
        if ann and msg.startswith("expected ") and " from " not in msg:
            raise BloblangError(f"{msg} from {ann}") from e
        raise


def _call_ast_method(target_q, name, arg_qs, kwarg_qs, ctx, ev):
    if name == "catch":
        try:
            v = ev(target_q, ctx)
        except BloblangError as e:
            # the lambda parameter binds the caught error STRING
            # (query.catch binds the error as the context) — binding
            # None made `err` unobservable in the handler
            return _elem_eval(arg_qs[0], ctx, str(e), ev) \
                if arg_qs[0][0] == "lambda" else ev(arg_qs[0], ctx)
        return v
    if name == "or":
        try:
            v = ev(target_q, ctx)
            if not is_null(v):
                return v
        except BloblangError:
            pass
        return ev(arg_qs[0], ctx)
    if name == "from":
        idx = get_int(ev(arg_qs[0], ctx))
        return _eval_on_message(target_q, idx, ctx, ev)
    if name == "from_all":
        return [_eval_on_message(target_q, i, ctx, ev)
                for i in range(len(ctx.batch))]
    if name == "apply":
        target = ev(target_q, ctx)
        map_name = get_string(ev(arg_qs[0], ctx))
        return apply_named_map(map_name, target, ctx)

    target = ev(target_q, ctx)

    if name in ("map_each",):
        if isinstance(target, list):
            out = []
            for el in target:
                r = _elem_eval(arg_qs[0], ctx, el, ev)
                if r is DELETE or r is NOTHING:
                    continue
                out.append(r)
            return out
        if isinstance(target, dict):
            out = {}
            for k in target:
                r = _elem_eval(arg_qs[0], ctx,
                               {"key": k, "value": target[k]}, ev)
                if r is DELETE or r is NOTHING:
                    continue
                out[k] = r
            return out
        raise BloblangError(
            f"expected array or object value, got {type_of(target)}")
    if name == "map":
        # NewHiddenMethodSpec("map") (methods.go:335): run the query
        # with the target as context
        return _elem_eval(arg_qs[0], ctx, target, ev)
    if name == "split_by":
        # methods_structured.go:1859+ — strings split per character
        # (separator chars dropped, empty segments kept); arrays split
        # at elements where the predicate is true (separators dropped)
        if isinstance(target, (str, bytes, bytearray)):
            is_bytes = not isinstance(target, str)
            s = get_string(target)
            if s == "":
                return [b"" if is_bytes else ""]
            segments, start = [], 0
            for i, ch in enumerate(s):
                r = _elem_eval(arg_qs[0], ctx, ch, ev)
                if r is not True:
                    continue
                seg = s[start:i]
                segments.append(seg.encode() if is_bytes else seg)
                start = i + 1
            seg = s[start:]
            segments.append(seg.encode() if is_bytes else seg)
            return segments
        if isinstance(target, list):
            if not target:
                return [[]]
            segments, cur = [], []
            for el in target:
                r = _elem_eval(arg_qs[0], ctx, el, ev)
                if r is True:
                    segments.append(cur)
                    cur = []
                else:
                    cur.append(el)
            segments.append(cur)
            return segments
        raise BloblangError(
            f"expected string, array or bytes value, got {type_of(target)}")
    if name == "map_each_key":
        if not isinstance(target, dict):
            raise BloblangError(
                f"expected object value, got {type_of(target)}")
        out = {}
        for k, v in target.items():
            nk = _elem_eval(arg_qs[0], ctx, k, ev)
            if nk is DELETE or nk is NOTHING:
                continue
            out[get_string(nk)] = v
        return out
    if name == "filter":
        if isinstance(target, list):
            return [el for el in target
                    if get_bool(_elem_eval(arg_qs[0], ctx, el, ev))]
        if isinstance(target, dict):
            return {k: v for k, v in target.items()
                    if get_bool(_elem_eval(
                        arg_qs[0], ctx, {"key": k, "value": v}, ev))}
        raise BloblangError(
            f"expected array or object value, got {type_of(target)}")
    if name == "sort":
        if not isinstance(target, list):
            raise BloblangError(
                f"expected array value, got {type_of(target)}")
        if arg_qs:
            import functools

            def cmp(a, b):
                less = get_bool(_elem_eval(
                    arg_qs[0], ctx, {"left": a, "right": b}, ev))
                return -1 if less else 1

            return sorted(target, key=functools.cmp_to_key(cmp))
        return sorted(target, key=_sort_key)
    if name == "sort_by":
        if not isinstance(target, list):
            raise BloblangError(
                f"expected array value, got {type_of(target)}")
        return sorted(target, key=lambda el: _sort_key(
            _elem_eval(arg_qs[0], ctx, el, ev)))
    if name == "fold":
        if not isinstance(target, list):
            raise BloblangError(
                f"expected array value, got {type_of(target)}")
        tally = ev(arg_qs[0], ctx)
        for el in target:
            tally = _elem_eval(arg_qs[1], ctx,
                               {"tally": tally, "value": el}, ev)
        return tally
    if name in ("any", "all"):
        if not isinstance(target, list):
            raise BloblangError(
                f"expected array value, got {type_of(target)}")
        results = (get_bool(_elem_eval(arg_qs[0], ctx, el, ev))
                   for el in target)
        return any(results) if name == "any" else all(results)
    if name in ("find", "find_all"):
        # reference semantics (methods_structured.go:443-446): the
        # argument is a VALUE compared with ICompare; predicate forms
        # are the separate find_by / find_all_by methods
        if not isinstance(target, list):
            raise BloblangError(
                f"expected array value, got {type_of(target)}")
        want = ev(arg_qs[0], ctx)
        if name == "find":
            for i, el in enumerate(target):
                if icompare(el, want):
                    return i
            return -1
        return [i for i, el in enumerate(target) if icompare(el, want)]
    if name in ("find_by", "find_all_by"):
        if not isinstance(target, list):
            raise BloblangError(
                f"expected array value, got {type_of(target)}")
        hits = [i for i, el in enumerate(target)
                if get_bool(_elem_eval(arg_qs[0], ctx, el, ev))]
        if name == "find_all_by":
            return hits
        return hits[0] if hits else -1
    raise BloblangError(f"unhandled AST method {name}")


def _sort_key(v):
    """Default sort comparator: numbers before strings, matching Go's
    restricted compare (sort errors on mixed types; a stable type-tag
    tiebreak keeps us total instead)."""
    if isinstance(v, bool):
        return (0, v)
    if isinstance(v, (int, float)):
        return (1, float(v))
    if isinstance(v, (str, bytes, bytearray)):
        return (2, get_string(v))
    return (3, go_json_dumps(v))


def _eval_on_message(target_q, idx, ctx, ev):
    from bento_ray.blobl.interp import Context, _LazyThis

    if idx < 0 or idx >= len(ctx.batch):
        return None
    msg = ctx.batch[idx]
    sub = Context(stack=(_LazyThis(msg.structured),), named=ctx.named,
                  vars=ctx.vars, meta=dict(msg.meta), root_ref=[NOTHING],
                  index=idx, batch=ctx.batch, maps=ctx.maps, env=ctx.env,
                  counters=ctx.counters, legacy=ctx.legacy)
    return ev(target_q, sub)


def apply_named_map(map_name, target, ctx):
    from bento_ray.blobl.interp import Context, exec_statements

    if map_name not in ctx.maps:
        raise BloblangError(f"map {map_name} was not found")
    stmts = ctx.maps[map_name]
    root_ref = [NOTHING]
    sub = Context(stack=(target,), named={}, vars={}, meta=ctx.meta,
                  root_ref=root_ref, index=ctx.index, batch=ctx.batch,
                  maps=ctx.maps, env=ctx.env, counters=ctx.counters,
                  legacy=ctx.legacy)
    exec_statements(stmts, sub)
    return root_ref[0]


# ------------------------------------------------------------ value methods

def dispatch(name, v, args, kwargs, ctx):
    fn = _REGISTRY.get(name)
    if fn is None:
        raise BloblangError(f"unrecognised method '{name}'")
    return fn(v, args, kwargs, ctx)


def _m(fn):
    """Adapt simple (value, *args) implementations."""
    def wrapper(v, args, kwargs, ctx):
        return fn(v, *args, **kwargs)
    return wrapper


def _num_method(fn):
    def wrapper(v, args, kwargs, ctx):
        return fn(get_number(v), *args)
    return wrapper


def _int_ranged(bits: int, signed: bool = True):
    """Width-checked integer cast (bloblang_numbers.go int8/16/32 /
    uint32: a value exceeding the width's capacity ERRORS — the old
    mask/no-op versions silently returned out-of-range values)."""
    lo = -(1 << (bits - 1)) if signed else 0
    hi = (1 << (bits - 1)) - 1 if signed else (1 << bits) - 1
    kind = f"{'int' if signed else 'uint'}{bits}"

    def _f(f):
        i = int(f)
        if not (lo <= i <= hi):
            raise BloblangError(
                f"value {i} exceeds the capacity of a {kind}")
        return i
    return _f


def _maybe_int(f: float):
    return int(f) if f == math.floor(f) and abs(f) < (1 << 62) else f


def _string_like(v):
    return isinstance(v, (str, bytes, bytearray))


def m_length(v):
    if _string_like(v):
        return len(get_bytes(v))
    if isinstance(v, (list, dict)):
        return len(v)
    raise BloblangError(f"expected string/array/object, got {type_of(v)}")


def m_number(v, *default):
    if isinstance(v, bool):
        raise BloblangError("expected number, got bool")
    if isinstance(v, (int, float)):
        return v
    try:
        s = get_string(v).strip()
        if re.fullmatch(r"[+-]?\d+", s):
            return int(s)
        return float(s)
    except (BloblangError, ValueError):
        if default:
            return default[0]
        raise BloblangError(f"cannot parse {v!r} as number")


def m_slice(v, low, high=None):
    low = get_int(low)
    if high is not None:
        high = get_int(high)
    if _string_like(v):
        s = get_string(v)
        return s[low:high]
    if isinstance(v, list):
        return v[low:high]
    raise BloblangError(f"expected string or array, got {type_of(v)}")


def m_contains(v, needle):
    if isinstance(v, dict):
        return any(icompare(x, needle) for x in v.values())
    if isinstance(v, list):
        return any(icompare(x, needle) for x in v)
    return get_string(needle) in get_string(v)


def m_index(v, i):
    i = get_int(i)
    if isinstance(v, list):
        if -len(v) <= i < len(v):
            return v[i]
        return None
    s = get_bytes(v)
    if -len(s) <= i < len(s):
        return s[i]
    return None


def m_encode(v, scheme):
    b = get_bytes(v)
    scheme = get_string(scheme)
    if scheme == "base64":
        return base64.b64encode(b).decode()
    if scheme == "base64url":
        return base64.urlsafe_b64encode(b).decode()
    if scheme == "base64rawurl":
        return base64.urlsafe_b64encode(b).decode().rstrip("=")
    if scheme == "hex":
        return binascii.hexlify(b).decode()
    if scheme == "ascii85":
        return base64.a85encode(b).decode()
    raise BloblangError(f"unrecognised encoding {scheme}")


def m_decode(v, scheme):
    s = get_string(v)
    scheme = get_string(scheme)
    if scheme == "base64":
        return base64.b64decode(s)
    if scheme == "base64url":
        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))
    if scheme == "base64rawurl":
        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))
    if scheme == "hex":
        return binascii.unhexlify(s)
    if scheme == "ascii85":
        return base64.a85decode(s)
    raise BloblangError(f"unrecognised encoding {scheme}")


def m_encrypt_aes(v, scheme, key, iv):
    """encrypt_aes (methods_strings.go:282-384): ctr/ofb/cbc/gcm over
    AES-128/192/256; returns the raw ciphertext bytes (Go returns a
    byte-string). GCM appends the 16-byte tag (nil AAD)."""
    from bento_ray import aescipher as ac

    scheme = get_string(scheme)
    b, key_b, iv_b = get_bytes(v), get_bytes(key), get_bytes(iv)
    try:
        if scheme == "ctr":
            return ac.ctr_xor(key_b, iv_b, b)
        if scheme == "ofb":
            return ac.ofb_xor(key_b, iv_b, b)
        if scheme == "cbc":
            return ac.cbc_encrypt(key_b, iv_b, b)
        if scheme == "gcm":
            return ac.gcm_seal(key_b, iv_b, b)
    except ac.AESError as e:
        raise BloblangError(str(e)) from None
    raise BloblangError(f"unrecognized encryption type: {scheme}")


def m_decrypt_aes(v, scheme, key, iv):
    """decrypt_aes (methods_strings.go:388-505)."""
    from bento_ray import aescipher as ac

    scheme = get_string(scheme)
    b, key_b, iv_b = get_bytes(v), get_bytes(key), get_bytes(iv)
    try:
        if scheme == "ctr":
            return ac.ctr_xor(key_b, iv_b, b)
        if scheme == "ofb":
            return ac.ofb_xor(key_b, iv_b, b)
        if scheme == "cbc":
            return ac.cbc_decrypt(key_b, iv_b, b)
        if scheme == "gcm":
            return ac.gcm_open(key_b, iv_b, b)
    except ac.AESError as e:
        raise BloblangError(str(e)) from None
    raise BloblangError(f"unrecognized decryption type: {scheme}")


def m_hash(v, algorithm, *extra, **kw):
    """Reference: methods_strings.go:820-900 — returns BYTES; xxhash64 /
    crc32 return their decimal representation as ASCII bytes."""
    b = get_bytes(v)
    algorithm = get_string(algorithm)
    key = kw.get("key")
    if algorithm.startswith("hmac_"):
        import hmac as _hmac

        if key is None and extra:
            key = extra[0]
        digestmod = {"hmac_sha1": "sha1", "hmac_sha256": "sha256",
                     "hmac_sha512": "sha512"}[algorithm]
        return _hmac.new(get_bytes(key), b, digestmod).digest()
    if algorithm == "xxhash64":
        from bento_ray.functions.bloblang import _xxh64_impl

        return str(_xxh64_impl()(b)).encode()
    if algorithm == "crc32":
        return str(binascii.crc32(b) & 0xFFFFFFFF).encode()
    try:
        return hashlib.new(algorithm, b).digest()
    except ValueError:
        raise BloblangError(f"unrecognised hash type {algorithm}")


def m_compress(v, algorithm="gzip", level=-1):
    # full algorithm census incl. snappy/lz4/zstd via compression.py
    # (bloblang_encoding.go compress -> algorithms.go CompressFunc)
    from bento_ray import compression

    b = get_bytes(v)
    try:
        return compression.compress(b, get_string(algorithm),
                                    get_int(level))
    except compression.CompressionError as e:
        raise BloblangError(str(e)) from e


def m_decompress(v, algorithm="gzip"):
    from bento_ray import compression

    b = get_bytes(v)
    try:
        return compression.decompress(b, get_string(algorithm))
    except compression.CompressionError as e:
        raise BloblangError(str(e)) from e


def m_parse_csv(v, parse_header_row=True, delimiter=",", lazy_quotes=False):
    import csv as _csv
    import io

    s = get_string(v)
    rows = list(_csv.reader(io.StringIO(s),
                            delimiter=get_string(delimiter)))
    if not rows:
        return []
    header = parse_header_row if isinstance(parse_header_row, bool) \
        else get_bool(parse_header_row)
    if header:
        hdr = rows[0]
        return [dict(zip(hdr, r)) for r in rows[1:]]
    return [list(r) for r in rows]


def m_replace_many(v, pairs):
    s = get_string(v)
    if not isinstance(pairs, list) or len(pairs) % 2:
        raise BloblangError("replace_many requires an even-length array")
    for i in range(0, len(pairs), 2):
        s = s.replace(get_string(pairs[i]), get_string(pairs[i + 1]))
    return s


def m_merge(v, other):
    return _deep_merge(v, other)


def m_without(v, *paths):
    if not isinstance(v, dict):
        raise BloblangError(f"expected object value, got {type_of(v)}")
    tree: dict = {}
    for p in paths:
        parts = get_string(p).split(".")
        node = tree
        for seg in parts[:-1]:
            node = node.setdefault(seg, {})
        node[parts[-1]] = None

    def strip(obj, t):
        if not isinstance(obj, dict):
            return obj
        out = {}
        for k, val in obj.items():
            if k in t:
                if t[k] is None:
                    continue
                out[k] = strip(val, t[k])
            else:
                out[k] = val
        return out

    return strip(v, tree)


def m_format_timestamp(v, fmt="2006-01-02T15:04:05.999999999Z07:00",
                       tz=None):
    dt = _parse_ts(v)
    if tz:
        import zoneinfo

        dt = dt.astimezone(zoneinfo.ZoneInfo(get_string(tz)))
    fmt = get_string(fmt)
    if fmt == "2006-01-02T15:04:05.999999999Z07:00":
        return _format_rfc3339(dt)
    py = fmt
    for go, p in _GO_LAYOUT_MAP:
        py = py.replace(go, p)
    out = dt.strftime(py.replace("%-m", str(dt.month))
                      .replace("%-d", str(dt.day))
                      .replace("%-I", str(((dt.hour - 1) % 12) + 1)))
    if "%:z" in out:
        off = dt.strftime("%z")
        out = out.replace("%:z", "Z" if off in ("+0000", "")
                          else off[:3] + ":" + off[3:])
    return out


def m_parse_timestamp(v, fmt=None):
    s = get_string(v)
    if fmt is None or get_string(fmt) in (
            "2006-01-02T15:04:05.999999999Z07:00", "2006-01-02T15:04:05Z07:00"):
        return _format_rfc3339(_parse_ts(s))
    py = get_string(fmt)
    for go, p in _GO_LAYOUT_MAP:
        py = py.replace(go, p)
    try:
        dt = datetime.datetime.strptime(s, py)
    except ValueError as e:
        raise BloblangError(str(e))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return _format_rfc3339(dt)


def _mk_parse_jwt(alg):
    """parse_jwt_* (internal/impl/crypto/jwt_parse.go): verify with
    the method's fixed algorithm and return the claims object."""
    def f(v, signing_secret):
        from bento_ray import jwtauth

        try:
            return jwtauth.parse_jwt(get_string(v), alg,
                                     get_string(signing_secret))
        except jwtauth.JWTError as e:
            raise BloblangError(str(e)) from None
    return f


def _mk_sign_jwt(alg):
    """sign_jwt_* (internal/impl/crypto/jwt_sign.go): sign a claims
    object, returning the compact JWS string."""
    def f(v, signing_secret):
        from bento_ray import jwtauth

        if not isinstance(v, dict):
            raise BloblangError(
                f"expected object value, got {type_of(v)}")
        try:
            return jwtauth.sign_jwt(v, alg, get_string(signing_secret))
        except jwtauth.JWTError as e:
            raise BloblangError(str(e)) from None
    return f


def _mk_geoip(method):
    """geoip_* (internal/impl/maxmind/bloblang_geoip.go): mmdb lookup
    returning the geoip2-golang struct shape; the reader is cached per
    path (the reference opens the DB once at method construction)."""
    def f(v, path):
        from bento_ray import geoip

        try:
            return geoip.geoip_lookup(method, get_string(v),
                                      get_string(path))
        except geoip.GeoIPError as e:
            raise BloblangError(str(e)) from None
    return f


def m_compare_argon2(v, hashed_secret):
    """compare_argon2 (internal/impl/crypto/argon2.go): True iff the
    input matches the fully-qualified argon2i/argon2id hash string.
    Empty input returns False without parsing (argon2.go:126-128)."""
    from bento_ray import argon2kdf

    source = get_string(v)
    if source == "":
        return False
    try:
        return argon2kdf.compare(source.encode(),
                                 get_string(hashed_secret))
    except argon2kdf.Argon2Error as e:
        raise BloblangError(str(e)) from None


def m_compare_bcrypt(v, hashed_secret):
    """compare_bcrypt (internal/impl/crypto/bcrypt.go): True iff the
    input matches the bcrypt hash; malformed hashes error."""
    from bento_ray import bcryptkdf

    try:
        return bcryptkdf.compare(get_string(v).encode(),
                                 get_string(hashed_secret))
    except bcryptkdf.BcryptError as e:
        raise BloblangError(str(e)) from None


def _build_registry():
    R = {}

    def reg(name, fn):
        R[name] = fn

    # general
    reg("exists", _m(lambda v, p: _walk(v, p) is not None))
    reg("get", _m(lambda v, p: _walk(v, p)))
    reg("type", _m(lambda v: type_of(v)))
    reg("not_null", _m(_not_null))
    reg("not_empty", _m(_not_empty))
    reg("string", _m(_ito_string))
    reg("bytes", _m(get_bytes))
    reg("number", _m(m_number))
    reg("bool", _m(_to_bool))
    reg("index", _m(m_index))
    reg("length", _m(m_length))
    reg("array", _m(lambda v: v if isinstance(v, list) else [v]))

    # strings
    reg("uppercase", _m(lambda v: get_string(v).upper()))
    reg("lowercase", _m(lambda v: get_string(v).lower()))
    reg("capitalize", _m(lambda v: get_string(v).title()))
    reg("trim", _m(lambda v, cutset=None: get_string(v).strip(
        get_string(cutset) if cutset is not None else None)))
    reg("trim_prefix", _m(lambda v, p: get_string(v)[len(get_string(p)):]
        if get_string(v).startswith(get_string(p)) else get_string(v)))
    reg("trim_suffix", _m(lambda v, p: get_string(v)[:-len(get_string(p))]
        if get_string(p) and get_string(v).endswith(get_string(p))
        else get_string(v)))
    reg("split", _m(lambda v, sep: get_string(v).split(get_string(sep))))
    reg("join", _join)
    reg("contains", _m(m_contains))
    reg("has_prefix", _m(lambda v, p: get_string(v).startswith(
        get_string(p))))
    reg("has_suffix", _m(lambda v, p: get_string(v).endswith(
        get_string(p))))
    reg("index_of", _m(lambda v, sub: get_string(v).find(get_string(sub))))
    reg("slice", _m(m_slice))
    reg("quote", _m(lambda v: json.dumps(_ito_string(v),
                                         ensure_ascii=False)))
    reg("unquote", _m(lambda v: json.loads(get_string(v))))
    reg("reverse", _m(_reverse))
    reg("repeat", _m(lambda v, n: get_string(v) * get_int(n)))
    reg("pad_left", _m(lambda v, n, pad=" ": get_string(v).rjust(
        get_int(n), get_string(pad))))
    reg("pad_right", _m(lambda v, n, pad=" ": get_string(v).ljust(
        get_int(n), get_string(pad))))
    reg("escape_html", _m(lambda v: _escape_html_go(get_string(v))))
    reg("unescape_html", _m(lambda v: _html.unescape(get_string(v))))
    reg("escape_url_query", _m(lambda v: urllib.parse.quote_plus(
        get_string(v))))
    reg("unescape_url_query", _m(lambda v: urllib.parse.unquote_plus(
        get_string(v))))
    reg("slug", _m(_slug))
    reg("strip_html", _m(_strip_html))
    reg("replace_all", _m(lambda v, old, new: get_string(v).replace(
        get_string(old), get_string(new))))
    reg("replace", _m(lambda v, old, new: get_string(v).replace(
        get_string(old), get_string(new))))  # hidden alias
    reg("replace_many", _m(m_replace_many))
    reg("replace_all_many", _m(m_replace_many))
    reg("re_match", _m(lambda v, p: bool(re.search(
        _go_regex(get_string(p)), get_string(v)))))
    reg("re_find_all", _m(lambda v, p: [
        m.group(0) for m in re.finditer(
            _go_regex(get_string(p)), get_string(v))]))
    reg("re_find_all_submatch", _m(_re_find_all_submatch))
    reg("re_find_object", _m(_re_find_object))
    reg("re_replace_all", _m(lambda v, p, r: re.sub(
        _go_regex(get_string(p)), _go_template(get_string(r)),
        get_string(v))))
    reg("format", _m(_format))
    reg("parse_json", _m(lambda v: _parse_json(v)))
    reg("parse_xml", _m(m_parse_xml))
    reg("parse_msgpack", _m(_parse_msgpack))
    reg("format_msgpack", _m(_format_msgpack))
    reg("format_json", _m(_format_json))
    reg("parse_yaml", _m(_parse_yaml))
    reg("format_yaml", _m(_format_yaml))
    reg("parse_csv", _parse_csv_entry)
    reg("encode", _m(m_encode))
    reg("decode", _m(m_decode))
    reg("encrypt_aes", _m(m_encrypt_aes))
    reg("decrypt_aes", _m(m_decrypt_aes))
    # JWT + password-hash comparisons (internal/impl/crypto/): 9 parse
    # + 9 sign methods, one per golang-jwt algorithm, plus
    # compare_argon2 / compare_bcrypt.
    for _alg in ("HS256", "HS384", "HS512", "RS256", "RS384", "RS512",
                 "ES256", "ES384", "ES512"):
        reg(f"parse_jwt_{_alg.lower()}", _m(_mk_parse_jwt(_alg)))
        reg(f"sign_jwt_{_alg.lower()}", _m(_mk_sign_jwt(_alg)))
    reg("compare_argon2", _m(m_compare_argon2))
    reg("compare_bcrypt", _m(m_compare_bcrypt))
    # geoip_* (internal/impl/maxmind/bloblang_geoip.go): mmdb lookups
    # shaped as the geoip2-golang structs.
    for _gm in ("geoip_city", "geoip_country", "geoip_asn",
                "geoip_enterprise", "geoip_anonymous_ip",
                "geoip_connection_type", "geoip_domain", "geoip_isp"):
        reg(_gm, _m(_mk_geoip(_gm)))
    reg("hash", m_hash_entry)
    reg("compress", _compress_entry)
    reg("decompress", _decompress_entry)
    reg("parse_url", _m(_parse_url))
    reg("parse_duration", _m(lambda v: _parse_duration(get_string(v))))
    # reference (bloblang_time.go:166-198) returns NANOSECONDS
    reg("parse_duration_iso8601", _m(
        lambda v: int(_parse_iso8601_duration(get_string(v)) * 1e9)))
    reg("filepath_join", _m(lambda v: "/".join(
        get_string(x) for x in v)))
    reg("filepath_split", _m(_filepath_split))

    # timestamps
    reg("parse_timestamp", _m(m_parse_timestamp))
    reg("format_timestamp", _m(m_format_timestamp))
    # deprecated aliases (pure/bloblang_time.go *SpecDep registrations)
    reg("parse_timestamp_strptime", _m(lambda v, f: _format_rfc3339(
        _strptime(get_string(v), get_string(f)))))
    reg("format_timestamp_strftime",
        _m(lambda v, f, tz=None: _strftime(v, f, tz)))
    reg("format_timestamp_unix", _m(lambda v: int(
        _parse_ts(v).timestamp())))
    reg("format_timestamp_unix_milli", _m(lambda v: int(
        _parse_ts(v).timestamp() * 1_000)))
    reg("format_timestamp_unix_micro", _m(lambda v: int(
        _parse_ts(v).timestamp() * 1_000_000)))
    reg("format_timestamp_unix_nano", _m(lambda v: int(
        _parse_ts(v).timestamp() * 1_000_000_000)))
    reg("ts_sub", _m(m_ts_sub))
    # trig + pow (pure/bloblang_numbers.go v2 pack)
    reg("cos", _num_method(math.cos))
    reg("sin", _num_method(math.sin))
    reg("tan", _num_method(math.tan))
    reg("pow", _num_method(lambda v, e: v ** get_number(e)))
    # structured / parsing additions
    reg("re_find_all_object", _m(_re_find_all_object))
    reg("re_replace", _m(lambda v, p, r: dispatch(
        "re_replace_all", v, [p, r], {}, None)))  # deprecated alias
    reg("format_xml", _m(m_format_xml))
    reg("json_schema", _m(m_json_schema))
    reg("json_path", _m(m_json_path))
    reg("parse_form_url_encoded", _m(m_parse_form_url_encoded))
    reg("parse_parquet", _m(m_parse_parquet))
    reg("diff", _m(m_diff))
    reg("patch", _m(m_patch))
    reg("ts_parse", _m(m_parse_timestamp))
    reg("ts_format", _m(m_format_timestamp))
    reg("ts_strptime", _m(lambda v, f: _format_rfc3339(
        _strptime(get_string(v), get_string(f)))))
    reg("ts_strftime", _m(lambda v, f, tz=None: _strftime(v, f, tz)))
    reg("ts_unix", _m(lambda v: int(_parse_ts(v).timestamp())))
    reg("ts_unix_milli", _m(lambda v: int(
        _parse_ts(v).timestamp() * 1e3)))
    reg("ts_unix_micro", _m(lambda v: int(
        _parse_ts(v).timestamp() * 1e6)))
    reg("ts_unix_nano", _m(lambda v: int(
        _parse_ts(v).timestamp() * 1e9)))
    reg("ts_add_iso8601", _m(lambda v, d: _format_rfc3339(
        _parse_ts(v) + datetime.timedelta(
            seconds=_parse_iso8601_duration(get_string(d))))))
    reg("ts_sub_iso8601", _m(lambda v, d: _format_rfc3339(
        _parse_ts(v) - datetime.timedelta(
            seconds=_parse_iso8601_duration(get_string(d))))))
    reg("ts_round", _m(_ts_round))
    reg("ts_tz", _m(_ts_tz))

    # numbers
    reg("abs", _num_method(lambda f: _maybe_int(abs(f))))
    reg("ceil", _num_method(lambda f: _maybe_int(math.ceil(f))))
    reg("floor", _num_method(lambda f: _maybe_int(math.floor(f))))
    reg("round", _num_method(lambda f: _maybe_int(
        math.floor(f + 0.5) if f >= 0 else math.ceil(f - 0.5))))
    reg("sqrt", _num_method(math.sqrt))
    reg("log", _num_method(math.log))
    reg("log10", _num_method(math.log10))
    reg("log2", _num_method(math.log2))
    reg("int8", _num_method(_int_ranged(8)))
    reg("int16", _num_method(_int_ranged(16)))
    reg("int32", _num_method(_int_ranged(32)))
    reg("int64", _num_method(int))
    reg("uint32", _num_method(_int_ranged(32, signed=False)))
    reg("uint64", _num_method(lambda f: int(f) & ((1 << 64) - 1)))
    reg("float32", _num_method(lambda f: f))
    reg("float64", _num_method(lambda f: f))
    reg("max", _m(_arr_max))
    reg("min", _m(_arr_min))

    # arrays
    reg("append", _m(lambda v, *items: _req_list(v) + list(items)))
    reg("concat", _m(lambda v, *others: _concat(v, others)))
    reg("enumerated", _m(lambda v: [
        {"index": i, "value": x} for i, x in enumerate(_req_list(v))]))
    reg("flatten", _m(_flatten))
    reg("sum", _m(_sum))
    reg("unique", _m(_unique))
    reg("zip", _m(_zip))
    reg("first", _m(lambda v: _req_list(v)[0] if _req_list(v) else None))
    reg("last", _m(lambda v: _req_list(v)[-1] if _req_list(v) else None))

    # objects
    reg("keys", _m(lambda v: sorted(_req_dict(v).keys())))
    reg("values", _m(lambda v: [
        _req_dict(v)[k] for k in sorted(_req_dict(v))]))
    reg("key_values", _m(lambda v: [
        {"key": k, "value": _req_dict(v)[k]} for k in sorted(_req_dict(v))]))
    reg("merge", _m(m_merge))
    reg("assign", _m(lambda v, other: {**_req_dict(v),
                                       **_req_dict(other)}))
    reg("without", _m(m_without))
    reg("with", _m(_with))
    reg("collapse", _m(_collapse))
    reg("squash", _m(_squash))
    reg("explode", _m(_explode))
    reg("invert", _m(_invert))
    reg("map_each_key", None)  # AST method; placeholder
    return R


def _not_null(v):
    if v is None:
        raise BloblangError("value is null")
    return v


def _not_empty(v):
    if _string_like(v) and len(get_string(v)) == 0 or \
            isinstance(v, (list, dict)) and len(v) == 0:
        raise BloblangError("value is empty")
    return v


def _to_bool(v, *default):
    try:
        if isinstance(v, bool):
            return v
        if isinstance(v, (int, float)):
            return v != 0
        s = get_string(v).lower()
        if s in ("true", "t", "1"):
            return True
        if s in ("false", "f", "0"):
            return False
        raise BloblangError(f"cannot parse {s!r} as bool")
    except BloblangError:
        if default:
            return default[0]
        raise


def _walk(v, p):
    from bento_ray.blobl.functions import _dot_path
    from bento_ray.blobl.interp import walk_path

    return walk_path(v, _dot_path(get_string(p)))


def _join(v, args, kwargs, ctx):
    sep = get_string(args[0]) if args else ""
    if not isinstance(v, list):
        raise BloblangError(f"expected array value, got {type_of(v)}")
    parts = []
    for x in v:
        if not _string_like(x):
            raise BloblangError(
                f"join failed: expected string value, got {type_of(x)}")
        parts.append(get_string(x))
    return sep.join(parts)


def _reverse(v):
    if _string_like(v):
        return get_string(v)[::-1]
    if isinstance(v, list):
        return v[::-1]
    raise BloblangError(f"expected string or array, got {type_of(v)}")


def _req_list(v):
    if not isinstance(v, list):
        raise BloblangError(f"expected array value, got {type_of(v)}")
    return v


def _req_dict(v):
    if not isinstance(v, dict):
        raise BloblangError(f"expected object value, got {type_of(v)}")
    return v


def _concat(v, others):
    out = list(_req_list(v))
    for o in others:
        out.extend(_req_list(o))
    return out


def _flatten(v):
    out = []
    for x in _req_list(v):
        if isinstance(x, list):
            out.extend(x)
        else:
            out.append(x)
    return out


def _sum(v):
    total = 0
    for x in _req_list(v):
        if isinstance(x, bool) or not isinstance(x, (int, float)):
            raise BloblangError(
                f"sum failed: expected number, got {type_of(x)}")
        total = total + x
    return total


def _arr_max(v, *arg):
    if isinstance(v, list):
        nums = [get_number(x) for x in v]
        if not nums:
            raise BloblangError("max of empty array")
        return _maybe_int(max(nums))
    return _maybe_int(max(get_number(v), get_number(arg[0])))


def _arr_min(v, *arg):
    if isinstance(v, list):
        nums = [get_number(x) for x in v]
        if not nums:
            raise BloblangError("min of empty array")
        return _maybe_int(min(nums))
    return _maybe_int(min(get_number(v), get_number(arg[0])))


def _unique(v):
    out = []
    seen = set()
    for x in _req_list(v):
        try:
            k = (type_of(x), x if not isinstance(x, (dict, list))
                 else go_json_dumps(x))
        except BloblangError:
            k = (type_of(x), repr(x))
        if k not in seen:
            seen.add(k)
            out.append(x)
    return out


def _zip(v, *others):
    lists = [_req_list(v)] + [_req_list(o) for o in others]
    return [list(t) for t in zip(*lists)]


def _with(v, *paths):
    d = _req_dict(v)
    out: dict = {}
    for p in paths:
        parts = get_string(p).split(".")
        src = d
        ok = True
        for seg in parts:
            if isinstance(src, dict) and seg in src:
                src = src[seg]
            else:
                ok = False
                break
        if ok:
            node = out
            for seg in parts[:-1]:
                node = node.setdefault(seg, {})
            node[parts[-1]] = src
    return out


def _collapse(v, include_empty=False):
    out = {}

    def rec(prefix, val):
        if isinstance(val, dict) and val:
            for k, x in val.items():
                rec(f"{prefix}.{k}" if prefix else str(k), x)
        elif isinstance(val, list) and val:
            for i, x in enumerate(val):
                rec(f"{prefix}.{i}" if prefix else str(i), x)
        else:
            if isinstance(val, (dict, list)) and not val and not include_empty:
                return
            out[prefix] = val

    rec("", v)
    return out


def _squash(v):
    arr = _req_list(v)
    out: dict = {}
    for item in arr:
        out = _deep_merge(out, _req_dict(item))
    return out


def _explode(v, path=None):
    d = _req_dict(v) if path is None else v
    if path is not None:
        target = _walk(v, path)
        parts = get_string(path).split(".")
        if isinstance(target, list):
            out = []
            for x in target:
                c = json.loads(go_json_dumps(v))
                node = c
                for seg in parts[:-1]:
                    node = node[seg]
                node[parts[-1]] = x
                out.append(c)
            return out
        if isinstance(target, dict):
            out = {}
            for k, x in target.items():
                c = json.loads(go_json_dumps(v))
                node = c
                for seg in parts[:-1]:
                    node = node[seg]
                node[parts[-1]] = x
                out[k] = c
            return out
        raise BloblangError("explode target must be array or object")
    raise BloblangError("explode requires a path argument")


def _invert(v):
    if isinstance(v, dict):
        return {_ito_string(val): k for k, val in v.items()}
    if isinstance(v, list):
        return {_ito_string(val): i for i, val in enumerate(v)}
    raise BloblangError(f"expected object or array, got {type_of(v)}")


def _parse_msgpack(v):
    """parse_msgpack (internal/impl/msgpack/bloblang.go)."""
    import msgpack

    try:
        return msgpack.unpackb(get_bytes(v), raw=False)
    except Exception as e:  # noqa: BLE001
        raise BloblangError(f"failed to parse msgpack: {e}")


def _format_msgpack(v):
    import msgpack

    return msgpack.packb(v, use_bin_type=True)


def _parse_json(v):
    try:
        return json.loads(get_string(v))
    except ValueError as e:
        raise BloblangError(f"failed to parse JSON: {e}")


def _format_json(v, indent=None, no_indent=False):
    if indent is None:
        return go_json_dumps(v)
    if isinstance(indent, int) and not isinstance(indent, bool):
        indent = " " * indent
    return json.dumps(v, indent=get_string(indent), sort_keys=True,
                      ensure_ascii=False)


def _parse_yaml(v):
    try:
        import yaml

        return yaml.safe_load(get_string(v))
    except ImportError:
        raise BloblangError("yaml support unavailable")


def _format_yaml(v):
    try:
        import yaml

        return yaml.safe_dump(v, default_flow_style=False,
                              sort_keys=False)
    except ImportError:
        raise BloblangError("yaml support unavailable")


def _parse_url(v):
    u = urllib.parse.urlparse(get_string(v))
    return {"scheme": u.scheme, "host": u.netloc, "path": u.path,
            "query": u.query, "fragment": u.fragment}


def _filepath_split(v):
    s = get_string(v)
    i = s.rfind("/")
    return [s[:i + 1], s[i + 1:]]


def _format(v, *args):
    # Go fmt.Sprintf subset: %v %s %d %f with width/precision
    s = get_string(v)
    go_to_py = re.sub(r"%([-+0-9.]*)v", r"%\1s", s)
    return go_to_py % tuple(_ito_string(a) if not isinstance(
        a, (int, float)) or isinstance(a, bool) else a for a in args)


def _re_find_all_submatch(v, p):
    out = []
    for m in re.finditer(_go_regex(get_string(p)), get_string(v)):
        groups = [m.group(0)] + [g if g is not None else ""
                                 for g in m.groups()]
        out.append(groups)
    return out


def _re_find_object(v, p):
    m = re.search(_go_regex(get_string(p)), get_string(v))
    if not m:
        return {}
    out = {"0": m.group(0)}
    for i, g in enumerate(m.groups(), 1):
        out[str(i)] = g if g is not None else ""
    for name, g in (m.groupdict() or {}).items():
        out[name] = g if g is not None else ""
    return out


def _re_find_all_object(v, p):
    """re_find_all_object (methods_strings.go:1734): one group-object
    per match."""
    out = []
    for m in re.finditer(_go_regex(get_string(p)), get_string(v)):
        obj = {"0": m.group(0)}
        for i, g in enumerate(m.groups(), 1):
            obj[str(i)] = g if g is not None else ""
        for name, g in (m.groupdict() or {}).items():
            obj[name] = g if g is not None else ""
        out.append(obj)
    return out


def _xml_escape(v, attr: bool = False) -> str:
    """Escape element text / attribute values — unescaped <, &, or
    quotes produce XML that format_xml's own parse_xml rejects."""
    s = str(v)
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        s = s.replace('"', "&quot;")
    return s


def _xml_value_to_elem(tag: str, val, indent: str, depth: int,
                       out: list) -> None:
    pad = indent * depth
    if isinstance(val, list):
        for item in val:
            _xml_value_to_elem(tag, item, indent, depth, out)
        return
    if isinstance(val, dict):
        attrs = "".join(
            f' {k[1:]}="{_xml_escape(v, attr=True)}"'
            for k, v in sorted(val.items()) if k.startswith("-"))
        children = {k: v for k, v in val.items()
                    if not k.startswith("-") and k != "#text"}
        text = val.get("#text")
        if not children and text is None:
            out.append(f"{pad}<{tag}{attrs}></{tag}>")
            return
        if not children:
            out.append(f"{pad}<{tag}{attrs}>{_xml_escape(text)}</{tag}>")
            return
        out.append(f"{pad}<{tag}{attrs}>")
        if text is not None:
            out.append(f"{pad}{indent}{_xml_escape(text)}")
        for k in children:
            _xml_value_to_elem(k, children[k], indent, depth + 1, out)
        out.append(f"{pad}</{tag}>")
        return
    sval = "" if val is None else (
        ("true" if val else "false") if isinstance(val, bool)
        else _xml_escape(val))
    out.append(f"{pad}<{tag}>{sval}</{tag}>")


def m_format_xml(v, indent="    ", no_indent=False):
    """format_xml (internal/impl/xml/bloblang.go:63+): object → XML
    bytes; 4-space indentation by default, newlines kept even with an
    empty indent string, ``no_indent`` flattens entirely."""
    if not isinstance(v, dict):
        raise BloblangError(f"expected object value, got {type_of(v)}")
    indent = "" if no_indent else get_string(indent)
    lines: list = []
    for tag in v:
        _xml_value_to_elem(tag, v[tag], indent, 0, lines)
    joined = "".join(lines) if no_indent else "\n".join(lines)
    return joined.encode("utf-8")


def m_json_schema(v, schema):
    """json_schema (methods_structured.go): validate the target
    against a JSON schema; returns the target unchanged or errors."""
    import json as _json

    from bento_ray.stages.parsers import JsonSchemaValidator

    sch = schema if isinstance(schema, dict) else \
        _json.loads(get_string(schema))
    err = JsonSchemaValidator(sch)._check(v, sch)
    if err:
        raise BloblangError(f"value failed JSON schema check: {err}")
    return v


_JP_PLURAL = re.compile(r"\.\.|\[\*\]|\.\*|\[\?\(")


def _jsonpath_step(nodes, tok):
    out = []
    for n in nodes:
        kind, arg = tok
        if kind == "name":
            if isinstance(n, dict) and arg in n:
                out.append(n[arg])
        elif kind == "wild":
            if isinstance(n, dict):
                out.extend(n.values())
            elif isinstance(n, list):
                out.extend(n)
        elif kind == "index":
            if isinstance(n, list) and -len(n) <= arg < len(n):
                out.append(n[arg])
        elif kind == "recur":
            stack = [n]
            while stack:
                cur = stack.pop(0)
                if isinstance(cur, dict):
                    if arg in cur:
                        out.append(cur[arg])
                    stack.extend(cur.values())
                elif isinstance(cur, list):
                    stack.extend(cur)
        elif kind == "filter":
            field, op, want = arg
            if isinstance(n, list):
                for el in n:
                    if isinstance(el, dict) and field in el:
                        ok = el[field] == want if op == "==" \
                            else el[field] != want
                        if ok:
                            out.append(el)
    return out


_JP_TOKEN = re.compile(
    r"\.\.(?P<recur>[A-Za-z_][\w]*)"
    r"|\.(?P<wildd>\*)"
    r"|\.(?P<name>[A-Za-z_][\w]*)"
    r"|\[\s*'(?P<qname>[^']*)'\s*\]"
    r"|\[\s*\"(?P<dqname>[^\"]*)\"\s*\]"
    r"|\[\s*(?P<index>-?\d+)\s*\]"
    r"|\[\s*(?P<wildb>\*)\s*\]"
    r"|\[\?\(\s*@\.(?P<ffield>[\w]+)\s*(?P<fop>==|!=)\s*"
    r"(?:'(?P<fstr>[^']*)'|(?P<fnum>-?\d+(?:\.\d+)?))\s*\)\]")


def m_json_path(v, expression):
    """json_path (internal/impl/jsonpath/bloblang_jsonpath.go) —
    subset evaluator: dot/bracket names, indices, wildcards,
    recursive descent, and [?(@.field=='x')] filters. Definite paths
    return the value itself; plural paths return an array (gval
    jsonpath convention shown in the reference examples)."""
    expr = get_string(expression)
    if not expr.startswith("$"):
        raise BloblangError(
            f"failed to evaluate json path expression: {expr!r}")
    rest = expr[1:]
    toks = []
    pos = 0
    while pos < len(rest):
        m = _JP_TOKEN.match(rest, pos)
        if not m:
            raise BloblangError(
                f"failed to evaluate json path expression: {expr!r}")
        if m.group("recur"):
            toks.append(("recur", m.group("recur")))
        elif m.group("wildd") or m.group("wildb"):
            toks.append(("wild", None))
        elif m.group("name") is not None:
            toks.append(("name", m.group("name")))
        elif m.group("qname") is not None:
            toks.append(("name", m.group("qname")))
        elif m.group("dqname") is not None:
            toks.append(("name", m.group("dqname")))
        elif m.group("index") is not None:
            toks.append(("index", int(m.group("index"))))
        else:
            want = m.group("fstr") if m.group("fstr") is not None else \
                float(m.group("fnum")) if "." in (m.group("fnum") or "") \
                else int(m.group("fnum"))
            toks.append(("filter", (m.group("ffield"), m.group("fop"),
                                    want)))
        pos = m.end()
    nodes = [v]
    for tok in toks:
        nodes = _jsonpath_step(nodes, tok)
    if _JP_PLURAL.search(expr):
        return nodes
    if not nodes:
        raise BloblangError(f"json path {expr!r} found no results")
    return nodes[0]


def m_parse_form_url_encoded(v):
    """parse_form_url_encoded (pure/bloblang_string.go): Go
    url.ParseQuery shape — single values collapse to scalars."""
    from urllib.parse import parse_qs

    try:
        parsed = parse_qs(get_string(v), keep_blank_values=True,
                          strict_parsing=False, errors="strict")
    except (UnicodeDecodeError, ValueError) as e:
        raise BloblangError(
            f"failed to parse value as url-encoded data: {e}")
    return {k: (vals[0] if len(vals) == 1 else list(vals))
            for k, vals in parsed.items()}


def m_parse_parquet(v):
    """parse_parquet (internal/impl/parquet/bloblang.go): parquet
    bytes → array of row objects."""
    import io as _io

    import pyarrow.parquet as _pq

    try:
        table = _pq.read_table(_io.BytesIO(get_bytes(v)))
    except Exception as e:
        raise BloblangError(f"failed to parse value as parquet: {e}")
    return table.to_pylist()


def _diff_changelog(a, b, path, out):
    """r3labs/diff-style changelog: entries {type, path, from, to}
    with string path segments. Slices compare by index (documented
    simplification of r3labs's unordered matching)."""
    if isinstance(a, dict) and isinstance(b, dict):
        for k in a:
            if k in b:
                _diff_changelog(a[k], b[k], path + [str(k)], out)
            else:
                out.append({"type": "delete", "path": path + [str(k)],
                            "from": a[k], "to": None})
        for k in b:
            if k not in a:
                out.append({"type": "create", "path": path + [str(k)],
                            "from": None, "to": b[k]})
        return
    if isinstance(a, list) and isinstance(b, list):
        for i in range(min(len(a), len(b))):
            _diff_changelog(a[i], b[i], path + [str(i)], out)
        for i in range(len(b), len(a)):
            out.append({"type": "delete", "path": path + [str(i)],
                        "from": a[i], "to": None})
        for i in range(len(a), len(b)):
            out.append({"type": "create", "path": path + [str(i)],
                        "from": None, "to": b[i]})
        return
    if a != b or type(a) is not type(b):
        out.append({"type": "update", "path": list(path),
                    "from": a, "to": b})


def m_diff(v, other):
    """diff (internal/impl/changelog/bloblang.go:12-43)."""
    if v is None:
        return None
    out: list = []
    _diff_changelog(v, other, [], out)
    return out


def m_patch(v, changelog):
    """patch (changelog/bloblang.go:45-87): apply a diff changelog."""
    import copy

    if v is None:
        return None
    if not isinstance(changelog, list):
        raise BloblangError(
            f"expected array changelog, got {type_of(changelog)}")
    doc = copy.deepcopy(v)
    for entry in changelog:
        path = [str(p) for p in entry.get("path", [])]
        typ = entry.get("type")
        if not path:
            continue
        parent = doc
        ok = True
        for seg in path[:-1]:
            if isinstance(parent, dict) and seg in parent:
                parent = parent[seg]
            elif isinstance(parent, list) and seg.lstrip("-").isdigit() \
                    and -len(parent) <= int(seg) < len(parent):
                parent = parent[int(seg)]
            else:
                ok = False
                break
        if not ok:
            continue
        leaf = path[-1]
        if isinstance(parent, list):
            if not leaf.lstrip("-").isdigit():
                continue
            idx = int(leaf)
            if typ == "delete":
                if -len(parent) <= idx < len(parent):
                    del parent[idx]
            elif typ == "create" and idx == len(parent):
                parent.append(entry.get("to"))
            elif -len(parent) <= idx < len(parent):
                parent[idx] = entry.get("to")
        elif isinstance(parent, dict):
            if typ == "delete":
                parent.pop(leaf, None)
            else:
                parent[leaf] = entry.get("to")
    return doc


def m_ts_sub(v, t2):
    """ts_sub (pure/bloblang_time.go:581-603): t1 - t2 in
    nanoseconds."""
    td = _parse_ts(v) - _parse_ts(t2)
    return (td.days * 86_400_000_000_000
            + td.seconds * 1_000_000_000
            + td.microseconds * 1_000)


def _slug(v):
    s = get_string(v).lower()
    s = re.sub(r"[^a-z0-9]+", "-", s)
    return s.strip("-")


def _strip_html(v):
    from bento_ray.html import strip_html as _sh

    return _sh(get_string(v))


def _escape_html_go(s: str) -> str:
    from bento_ray.html import go_escape

    return go_escape(s)


def _strptime(s, fmt):
    try:
        dt = datetime.datetime.strptime(s, fmt)
    except ValueError as e:
        raise BloblangError(str(e))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return dt


def _strftime(v, f, tz=None):
    dt = _parse_ts(v)
    if tz:
        import zoneinfo

        dt = dt.astimezone(zoneinfo.ZoneInfo(get_string(tz)))
    return dt.strftime(get_string(f))


def _ts_round(v, dur):
    dt = _parse_ts(v)
    ns = _parse_duration(get_string(dur)) if isinstance(dur, str) \
        else get_int(dur)
    sec = ns / 1e9
    epoch = dt.timestamp()
    rounded = round(epoch / sec) * sec
    return _format_rfc3339(datetime.datetime.fromtimestamp(
        rounded, tz=datetime.timezone.utc))


def _ts_tz(v, tz):
    import zoneinfo

    dt = _parse_ts(v).astimezone(zoneinfo.ZoneInfo(get_string(tz)))
    return _format_rfc3339(dt)


def _parse_csv_entry(v, args, kwargs, ctx):
    return m_parse_csv(v, *args, **kwargs)


def m_hash_entry(v, args, kwargs, ctx):
    return m_hash(v, *args, **kwargs)


def _compress_entry(v, args, kwargs, ctx):
    algo = kwargs.get("algorithm", args[0] if args else "gzip")
    level = kwargs.get("level", args[1] if len(args) > 1 else -1)
    return m_compress(v, algo, level)


def _decompress_entry(v, args, kwargs, ctx):
    algo = kwargs.get("algorithm", args[0] if args else "gzip")
    return m_decompress(v, algo)


_REGISTRY = _build_registry()
_REGISTRY.pop("map_each_key", None)
