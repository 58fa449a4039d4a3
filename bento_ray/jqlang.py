"""jq-subset evaluator — the ``jq`` processor's query language.

Reference: internal/impl/pure/processor_jq.go (delegates to gojq).
This implements the subset exercised by the reference's tests and
typical configs: paths with null-propagation (``.a.b``, ``.a[0]``,
``.[]``, ``?``), pipes, ``//`` alternative, object/array construction,
path assignment (``.a.b = expr``), ``select``, arithmetic/comparison,
``@csv``/``@json``/``@text`` formatters, and the common builtins
(length, keys, values, add, map, tostring, tonumber, type, first,
last, reverse, sort, unique, min, max, floor, ceil, not, empty,
has, range, join, split, ascii_downcase, ascii_upcase).

jq is stream-valued: every expression maps each input value to a LIST
of outputs (``.[]`` fans out; ``[expr]`` collects back).
"""

from __future__ import annotations

import itertools
import json
import math
import re


class JQError(ValueError):
    pass


# ------------------------------------------------------------------ lexer

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<num>\d+(\.\d+)?([eE][+-]?\d+)?)
  | (?P<str>"(\\.|[^"\\])*")
  | (?P<fmt>@[a-z0-9]+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\.\.|//|==|!=|<=|>=|\|=|\+=|-=|[.\[\]{}()|,:=<>+\-*/%?;])
""", re.X)


def _tokenize(src: str):
    toks = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise JQError(f"jq: bad character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "num":
            toks.append(("num", float(text) if "." in text or "e" in text
                         or "E" in text else int(text)))
        elif kind == "str":
            toks.append(("str", json.loads(text)))
        else:
            toks.append((kind, text))
    toks.append(("eof", None))
    return toks


# ----------------------------------------------------------------- parser

class _Parser:
    def __init__(self, src):
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def expect(self, kind, text=None):
        t = self.next()
        if t[0] != kind or (text is not None and t[1] != text):
            raise JQError(f"jq: expected {text or kind}, got {t}")
        return t

    def at_op(self, *vals):
        t = self.peek()
        return t[0] == "op" and t[1] in vals

    # pipe := comma ('|' comma)*   (jq: ',' binds tighter than '|')
    def parse_pipe(self):
        parts = [self.parse_comma()]
        while self.at_op("|"):
            self.next()
            parts.append(self.parse_comma())
        return parts[0] if len(parts) == 1 else ("pipe", parts)

    def parse_comma(self):
        parts = [self.parse_assign()]
        while self.at_op(","):
            self.next()
            parts.append(self.parse_assign())
        return parts[0] if len(parts) == 1 else ("comma", parts)

    def parse_assign(self):
        left = self.parse_alt()
        if self.at_op("="):
            self.next()
            right = self.parse_alt()
            return ("assign", left, right)
        if self.at_op("|="):
            self.next()
            right = self.parse_alt()
            return ("update", left, right)
        return left

    def parse_alt(self):
        left = self.parse_or()
        while self.at_op("//"):
            self.next()
            left = ("alt", left, self.parse_or())
        return left

    def parse_or(self):
        left = self.parse_and()
        while self.peek() == ("ident", "or"):
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.peek() == ("ident", "and"):
            self.next()
            left = ("and", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_add()
        while self.at_op("==", "!=", "<", ">", "<=", ">="):
            op = self.next()[1]
            left = ("cmp", op, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self.at_op("+", "-"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_postfix()
        while self.at_op("*", "/", "%"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_postfix())
        return left

    def parse_postfix(self):
        node = self.parse_primary()
        while True:
            if self.at_op("."):
                # .foo after expression e.g. (expr).field
                save = self.i
                self.next()
                t = self.peek()
                if t[0] == "ident":
                    self.next()
                    node = ("index", node, ("lit", t[1]))
                    continue
                self.i = save
                break
            if self.at_op("["):
                self.next()
                if self.at_op("]"):
                    self.next()
                    node = ("iterate", node)
                else:
                    idx = self.parse_pipe()
                    if self.at_op(":"):
                        self.next()
                        hi = None if self.at_op("]") else self.parse_pipe()
                        self.expect("op", "]")
                        node = ("slice", node, idx, hi)
                    else:
                        self.expect("op", "]")
                        node = ("index", node, idx)
                continue
            if self.at_op("?"):
                self.next()
                node = ("try", node)
                continue
            break
        return node

    def parse_primary(self):
        t = self.peek()
        if t[0] == "num" or t[0] == "str":
            self.next()
            return ("lit", t[1])
        if t[0] == "fmt":
            self.next()
            return ("format", t[1])
        if t == ("ident", "true"):
            self.next()
            return ("lit", True)
        if t == ("ident", "false"):
            self.next()
            return ("lit", False)
        if t == ("ident", "null"):
            self.next()
            return ("lit", None)
        if t == ("ident", "not"):
            self.next()
            return ("call", "not", [])
        if t[0] == "ident":
            self.next()
            if self.at_op("("):
                self.next()
                args = []
                if not self.at_op(")"):
                    args.append(self.parse_pipe())
                    while self.at_op(";"):
                        self.next()
                        args.append(self.parse_pipe())
                self.expect("op", ")")
                return ("call", t[1], args)
            return ("call", t[1], [])
        if t[0] == "op" and t[1] == ".":
            self.next()
            nt = self.peek()
            if nt[0] == "ident":
                self.next()
                return ("index", ("identity",), ("lit", nt[1]))
            if nt[0] == "str":
                self.next()
                return ("index", ("identity",), ("lit", nt[1]))
            return ("identity",)
        if t[0] == "op" and t[1] == "(":
            self.next()
            inner = self.parse_pipe()
            self.expect("op", ")")
            return inner
        if t[0] == "op" and t[1] == "[":
            self.next()
            if self.at_op("]"):
                self.next()
                return ("collect", None)
            inner = self.parse_pipe()
            self.expect("op", "]")
            return ("collect", inner)
        if t[0] == "op" and t[1] == "{":
            self.next()
            pairs = []
            while not self.at_op("}"):
                kt = self.next()
                if kt[0] in ("ident", "str"):
                    key = ("lit", kt[1])
                elif kt == ("op", "("):
                    key = self.parse_pipe()
                    self.expect("op", ")")
                else:
                    raise JQError(f"jq: bad object key {kt}")
                if self.at_op(":"):
                    self.next()
                    val = self.parse_assign()
                else:
                    val = ("index", ("identity",), key)
                pairs.append((key, val))
                if self.at_op(","):
                    self.next()
            self.expect("op", "}")
            return ("object", pairs)
        if t[0] == "op" and t[1] == "-":
            self.next()
            return ("neg", self.parse_postfix())
        raise JQError(f"jq: unexpected token {t}")


# --------------------------------------------------------------- evaluator

def _truthy(v):
    return v is not None and v is not False


def _index(v, k):
    if v is None:
        return None
    if isinstance(k, str):
        if not isinstance(v, dict):
            raise JQError(f"jq: cannot index {type(v).__name__} with "
                          f"string {k!r}")
        return v.get(k)
    if isinstance(k, (int, float)):
        if not isinstance(v, list):
            raise JQError(f"jq: cannot index {type(v).__name__} with number")
        i = int(k)
        if -len(v) <= i < len(v):
            return v[i]
        return None
    raise JQError(f"jq: bad index {k!r}")


def _collect_path(node, v, path):
    """Resolve an assignment LHS into concrete paths."""
    kind = node[0]
    if kind == "identity":
        return [path]
    if kind == "index":
        bases = _collect_path(node[1], v, path)
        keys = [k for k in _eval(node[2], v)]
        return [b + [k] for b in bases for k in keys]
    if kind == "iterate":
        bases = _collect_path(node[1], v, path)
        out = []
        for b in bases:
            tv = _get_path(v, b)
            if isinstance(tv, list):
                out.extend(b + [i] for i in range(len(tv)))
            elif isinstance(tv, dict):
                out.extend(b + [k] for k in tv)
        return out
    raise JQError("jq: invalid path expression in assignment")


def _get_path(v, path):
    for k in path:
        v = _index(v, k)
    return v


def _set_path(v, path, val):
    if not path:
        return val
    k = path[0]
    if isinstance(k, str):
        obj = dict(v) if isinstance(v, dict) else {}
        obj[k] = _set_path(obj.get(k), path[1:], val)
        return obj
    arr = list(v) if isinstance(v, list) else []
    i = int(k)
    while len(arr) <= i:
        arr.append(None)
    arr[i] = _set_path(arr[i], path[1:], val)
    return arr


def _fmt_csv(v):
    if not isinstance(v, list):
        raise JQError("jq: @csv expects an array")
    parts = []
    for x in v:
        if isinstance(x, bool):
            parts.append("true" if x else "false")
        elif isinstance(x, (int, float)):
            parts.append(_tostr_num(x))
        elif isinstance(x, str):
            parts.append('"' + x.replace('"', '""') + '"')
        elif x is None:
            parts.append("")
        else:
            raise JQError("jq: @csv cannot format nested values")
    return ",".join(parts)


def _tostr_num(x):
    if isinstance(x, float) and x == math.floor(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x) if isinstance(x, float) else str(x)


def _jq_tostring(v):
    if isinstance(v, str):
        return v
    return json.dumps(v, separators=(",", ":"), sort_keys=True)


def _call(name, args, v):
    if name == "select":
        return [v] if any(_truthy(c) for c in _eval(args[0], v)) else []
    if name == "empty":
        return []
    if name == "length":
        if v is None:
            return [0]
        if isinstance(v, bool):
            raise JQError("jq: bool has no length")
        if isinstance(v, (int, float)):
            return [abs(v)]
        return [len(v)]
    if name == "keys":
        return [sorted(v.keys())] if isinstance(v, dict) else \
            [list(range(len(v)))]
    if name == "values":
        # jq `values` is select(. != null) — emit the input iff
        # non-null (the idiomatic null filter), NOT "object values"
        return [] if v is None else [v]
    if name == "add":
        if not v:
            return [None]
        acc = v[0]
        for x in v[1:]:
            acc = _arith("+", acc, x)
        return [acc]
    if name == "map":
        out = []
        for x in v:
            out.extend(_eval(args[0], x))
        return [out]
    if name == "not":
        return [not _truthy(v)]
    if name == "tostring":
        return [_jq_tostring(v)]
    if name == "tonumber":
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return [v]
        f = float(v)
        return [int(f) if f == math.floor(f) else f]
    if name == "type":
        return [{type(None): "null", bool: "boolean", int: "number",
                 float: "number", str: "string", list: "array",
                 dict: "object"}[type(v)]]
    if name == "first":
        return [v[0]] if v else []
    if name == "last":
        return [v[-1]] if v else []
    if name == "reverse":
        return [list(reversed(v))]
    if name == "sort":
        return [sorted(v, key=_sort_key)]
    if name == "sort_by":
        return [sorted(v, key=lambda x: _sort_key(
            _eval(args[0], x)[0]))]
    if name == "unique":
        seen, out = set(), []
        for x in sorted(v, key=_sort_key):
            k = json.dumps(x, sort_keys=True)
            if k not in seen:
                seen.add(k)
                out.append(x)
        return [out]
    if name in ("min", "max"):
        if not v:
            return [None]
        f = min if name == "min" else max
        return [f(v, key=_sort_key)]
    if name == "floor":
        return [math.floor(v)]
    if name == "ceil":
        return [math.ceil(v)]
    if name == "fabs":
        return [abs(v)]
    if name == "has":
        k = _eval(args[0], v)[0]
        return [k in v if isinstance(v, dict) else
                0 <= int(k) < len(v)]
    if name == "range":
        vals = [_eval(a, v)[0] for a in args]
        return list(range(*[int(x) for x in vals]))
    if name == "join":
        sep = _eval(args[0], v)[0]
        return [sep.join("" if x is None else
                         x if isinstance(x, str) else _tostr_num(x)
                         for x in v)]
    if name == "split":
        sep = _eval(args[0], v)[0]
        return [v.split(sep)]
    if name == "ascii_downcase":
        return [v.lower()]
    if name == "ascii_upcase":
        return [v.upper()]
    if name == "error":
        raise JQError(str(_eval(args[0], v)[0]) if args else "jq: error")
    raise JQError(f"jq: unknown function {name}")


def _sort_key(v):
    order = {type(None): 0, bool: 1, int: 2, float: 2, str: 3,
             list: 4, dict: 5}
    t = order[type(v)]
    if t == 2:
        return (t, float(v))
    if t == 3:
        return (t, v)
    return (t, json.dumps(v, sort_keys=True))


def _arith(op, a, b):
    if op == "+":
        if a is None:
            return b
        if b is None:
            return a
        if isinstance(a, list) and isinstance(b, list):
            return a + b
        if isinstance(a, dict) and isinstance(b, dict):
            return {**a, **b}
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a + b
        raise JQError(f"jq: cannot add {type(a).__name__} and "
                      f"{type(b).__name__}")
    if op == "-":
        if isinstance(a, list) and isinstance(b, list):
            return [x for x in a if x not in b]
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        if isinstance(a, str) and isinstance(b, str):
            return a.split(b)
        if b == 0:
            raise JQError("jq: division by zero")
        q = a / b
        # jq yields an int when both operands are ints and it divides
        # evenly (gojq semantics): 4/2 → 2, not 2.0
        if isinstance(a, int) and isinstance(b, int) and a % b == 0:
            return a // b
        return q
    if op == "%":
        ia, ib = int(a), int(b)
        if ib == 0:
            raise JQError("jq: division by zero")
        # jq % is C-style truncation toward zero: -5 % 3 → -2
        r = ia % ib
        if r != 0 and (ia < 0) != (ib < 0):
            r -= ib
        return r
    raise JQError(f"jq: bad op {op}")


def _eval(node, v) -> list:
    kind = node[0]
    if kind == "identity":
        return [v]
    if kind == "lit":
        return [node[1]]
    if kind == "pipe":
        vals = [v]
        for part in node[1]:
            nxt = []
            for x in vals:
                nxt.extend(_eval(part, x))
            vals = nxt
        return vals
    if kind == "comma":
        out = []
        for part in node[1]:
            out.extend(_eval(part, v))
        return out
    if kind == "index":
        out = []
        for base in _eval(node[1], v):
            for k in _eval(node[2], v):
                out.append(_index(base, k))
        return out
    if kind == "slice":
        out = []
        for base in _eval(node[1], v):
            lo = _eval(node[2], v)[0] if node[2] else None
            hi = _eval(node[3], v)[0] if node[3] else None
            out.append(base[slice(None if lo is None else int(lo),
                                  None if hi is None else int(hi))])
        return out
    if kind == "iterate":
        out = []
        for base in _eval(node[1], v):
            if isinstance(base, list):
                out.extend(base)
            elif isinstance(base, dict):
                out.extend(base.values())
            elif base is None:
                continue
            else:
                raise JQError(
                    f"jq: cannot iterate over {type(base).__name__}")
        return out
    if kind == "try":
        try:
            return _eval(node[1], v)
        except (JQError, ValueError, TypeError, KeyError,
                ZeroDivisionError, AttributeError):
            # jq's `?` suppresses ANY evaluation error
            return []
    if kind == "collect":
        if node[1] is None:
            return [[]]
        return [list(_eval(node[1], v))]
    if kind == "object":
        streams = []
        for kq, vq in node[1]:
            kvals = _eval(kq, v)
            vvals = _eval(vq, v)
            streams.append([(k, x) for k in kvals for x in vvals])
        out = []
        for combo in itertools.product(*streams):
            out.append({k: x for k, x in combo})
        return out
    if kind == "alt":
        try:
            left = [x for x in _eval(node[1], v) if _truthy(x)]
        except JQError:
            left = []
        return left if left else _eval(node[2], v)
    if kind == "or":
        return [_truthy(a) or _truthy(b)
                for a in _eval(node[1], v) for b in _eval(node[2], v)]
    if kind == "and":
        return [_truthy(a) and _truthy(b)
                for a in _eval(node[1], v) for b in _eval(node[2], v)]
    if kind == "cmp":
        op = node[1]
        out = []
        for a in _eval(node[2], v):
            for b in _eval(node[3], v):
                ka, kb = _sort_key(a), _sort_key(b)
                out.append({"==": a == b, "!=": a != b,
                            "<": ka < kb, ">": ka > kb,
                            "<=": ka <= kb, ">=": ka >= kb}[op])
        return out
    if kind == "arith":
        return [_arith(node[1], a, b)
                for a in _eval(node[2], v) for b in _eval(node[3], v)]
    if kind == "neg":
        return [-x for x in _eval(node[1], v)]
    if kind == "format":
        f = node[1]
        if f == "@csv":
            return [_fmt_csv(v)]
        if f == "@json":
            return [json.dumps(v, separators=(",", ":"))]
        if f == "@text":
            return [_jq_tostring(v)]
        raise JQError(f"jq: unknown format {f}")
    if kind == "assign":
        out = []
        for rv in _eval(node[2], v):
            cur = v
            for p in _collect_path(node[1], v, []):
                cur = _set_path(cur, p, rv)
            out.append(cur)
        return out
    if kind == "update":
        cur = v
        for p in _collect_path(node[1], v, []):
            old = _get_path(cur, p)
            new = _eval(node[2], old)
            if new:
                cur = _set_path(cur, p, new[0])
        return [cur]
    if kind == "call":
        return _call(node[1], node[2], v)
    raise JQError(f"jq: bad node {kind}")


class JQ:
    """Compiled jq program: ``JQ(".foo.bar")(value) → [outputs]``."""

    def __init__(self, src: str):
        p = _Parser(src)
        self.ast = p.parse_pipe()
        if p.peek()[0] != "eof":
            raise JQError(f"jq: trailing input at token {p.peek()}")

    def __call__(self, value) -> list:
        return _eval(self.ast, value)


def jq_first(src: str, value):
    out = JQ(src)(value)
    return out[0] if out else None
