"""JMESPath-subset evaluator — the ``jmespath`` processor's language.

Reference: internal/impl/pure/processor_jmespath.go (delegates to
go-jmespath). Subset: dotted identifiers, ``[n]`` index, ``[*]`` / ``.*``
/ ``[]`` projections with null-filtering, filters ``[?expr]``, pipes
``|``, multiselect hash ``{k: expr}`` and list ``[e1, e2]``, raw JSON
literals ``` `…` ``` and ``'raw strings'``, comparisons and ``&&``,
``||``, ``!``, and the common functions (sum, merge, length, keys,
values, sort, sort_by, reverse, max, min, avg, abs, ceil, floor,
contains, join, split, starts_with, ends_with, to_string, to_number,
type, not_null, map, floor, merge).
"""

from __future__ import annotations

import json
import math
import re


class JMESError(ValueError):
    pass


_TOK = re.compile(r"""
    (?P<ws>\s+)
  | (?P<raw>`(\\.|[^`\\])*`)
  | (?P<rawstr>'[^']*')
  | (?P<str>"(\\.|[^"\\])*")
  | (?P<num>-?\d+(\.\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\[\?|\[\]|\|\||&&|==|!=|<=|>=|[.\[\]{}()|,:*@!<>&])
""", re.X)


def _tokenize(src):
    toks, i = [], 0
    while i < len(src):
        m = _TOK.match(src, i)
        if not m:
            raise JMESError(f"jmespath: bad char {src[i]!r}")
        i = m.end()
        g = m.lastgroup
        if g == "ws":
            continue
        text = m.group()
        if g == "raw":
            toks.append(("lit", json.loads(text[1:-1])))
        elif g == "rawstr":
            toks.append(("lit", text[1:-1]))
        elif g == "str":
            toks.append(("id", json.loads(text)))
        elif g == "num":
            toks.append(("num", float(text) if "." in text else int(text)))
        elif g == "ident":
            toks.append(("id", text))
        else:
            toks.append(("op", text))
    toks.append(("eof", None))
    return toks


class _P:
    def __init__(self, src):
        self.t = _tokenize(src)
        self.i = 0

    def peek(self, k=0):
        return self.t[min(self.i + k, len(self.t) - 1)]

    def next(self):
        tok = self.t[self.i]
        if tok[0] != "eof":
            self.i += 1
        return tok

    def at(self, *ops):
        tok = self.peek()
        return tok[0] == "op" and tok[1] in ops

    def expect(self, op):
        tok = self.next()
        if tok != ("op", op):
            raise JMESError(f"jmespath: expected {op!r}, got {tok}")

    def parse(self):
        e = self.parse_pipe()
        if self.peek()[0] != "eof":
            raise JMESError(f"jmespath: trailing {self.peek()}")
        return e

    def parse_pipe(self):
        left = self.parse_or()
        while self.at("|"):
            self.next()
            left = ("pipe", left, self.parse_or())
        return left

    def parse_or(self):
        left = self.parse_and()
        while self.at("||"):
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.at("&&"):
            self.next()
            left = ("and", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_unary()
        if self.at("==", "!=", "<", ">", "<=", ">="):
            op = self.next()[1]
            return ("cmp", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at("!"):
            self.next()
            return ("not", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        node = self.parse_primary()
        while True:
            if self.at("."):
                self.next()
                nxt = self.peek()
                if nxt == ("op", "*"):
                    self.next()
                    node = ("objproj", node)
                elif nxt[0] == "id":
                    self.next()
                    node = ("field", node, nxt[1])
                elif nxt == ("op", "{"):
                    node = ("subexpr", node, self.parse_primary())
                elif nxt == ("op", "["):
                    node = ("subexpr", node, self.parse_primary())
                else:
                    raise JMESError(f"jmespath: bad token after . {nxt}")
                continue
            if self.at("[]"):
                self.next()
                node = ("flatten", node)
                continue
            if self.at("[?"):
                self.next()
                cond = self.parse_pipe()
                self.expect("]")
                node = ("filter", node, cond)
                continue
            if self.at("["):
                self.next()
                if self.at("*"):
                    self.next()
                    self.expect("]")
                    node = ("arrproj", node)
                elif self.peek()[0] == "num":
                    n = self.next()[1]
                    self.expect("]")
                    node = ("index", node, int(n))
                else:
                    raise JMESError("jmespath: bad bracket")
                continue
            break
        return node

    def parse_primary(self):
        tok = self.peek()
        if tok[0] == "lit":
            self.next()
            return ("lit", tok[1])
        if tok == ("op", "@"):
            self.next()
            return ("current",)
        if tok == ("op", "("):
            self.next()
            e = self.parse_pipe()
            self.expect(")")
            return e
        if tok == ("op", "{"):
            self.next()
            pairs = []
            while not self.at("}"):
                k = self.next()
                if k[0] not in ("id",):
                    raise JMESError("jmespath: bad key")
                self.expect(":")
                pairs.append((k[1], self.parse_pipe()))
                if self.at(","):
                    self.next()
            self.expect("}")
            return ("mshash", pairs)
        if tok == ("op", "["):
            self.next()
            # bare [n] / [*] index/projection on the current value
            if self.peek()[0] == "num" and self.peek(1) == ("op", "]"):
                n = self.next()[1]
                self.expect("]")
                return ("index", ("current",), int(n))
            if self.at("*"):
                self.next()
                self.expect("]")
                return ("arrproj", ("current",))
            items = []
            while not self.at("]"):
                items.append(self.parse_pipe())
                if self.at(","):
                    self.next()
            self.expect("]")
            return ("mslist", items)
        if tok[0] == "id":
            self.next()
            if self.at("("):
                self.next()
                args = []
                while not self.at(")"):
                    if self.at("&"):
                        self.next()
                        args.append(("expref", self.parse_pipe()))
                    else:
                        args.append(self.parse_pipe())
                    if self.at(","):
                        self.next()
                self.expect(")")
                return ("call", tok[1], args)
            return ("field", ("current",), tok[1])
        raise JMESError(f"jmespath: unexpected {tok}")


_NULLProj = object()


def _ev(node, v):
    k = node[0]
    if k == "current":
        return v
    if k == "lit":
        return node[1]
    if k == "field":
        base = _ev(node[1], v)
        if isinstance(base, _Proj):
            return base.map(lambda x: x.get(node[2])
                            if isinstance(x, dict) else None)
        if isinstance(base, dict):
            return base.get(node[2])
        return None
    if k == "index":
        base = _ev(node[1], v)
        if isinstance(base, _Proj):
            # index applies PER projected element (JMESPath spec)
            return base.map(lambda x: x[node[2]]
                            if isinstance(x, list) and
                            -len(x) <= node[2] < len(x) else None)
        if isinstance(base, list) and -len(base) <= node[2] < len(base):
            return base[node[2]]
        return None
    if k == "arrproj":
        base = _stop(_ev(node[1], v))
        if not isinstance(base, list):
            return None
        return _Proj(list(base))
    if k == "objproj":
        base = _stop(_ev(node[1], v))
        if not isinstance(base, dict):
            return None
        return _Proj(list(base.values()))
    if k == "flatten":
        base = _stop(_ev(node[1], v))
        if not isinstance(base, list):
            return None
        out = []
        for x in base:
            if isinstance(x, list):
                out.extend(x)
            else:
                out.append(x)
        return _Proj(out)
    if k == "filter":
        base = _stop(_ev(node[1], v))
        if not isinstance(base, list):
            return None
        return _Proj([x for x in base if _truthy(_stop(_ev(node[2], x)))])
    if k == "subexpr":
        base = _ev(node[1], v)
        if isinstance(base, _Proj):
            return base.map(lambda x: _stop(_ev(node[2], x)))
        return _stop(_ev(node[2], base))
    if k == "pipe":
        return _stop(_ev(node[2], _stop(_ev(node[1], v))))
    if k == "or":
        left = _stop(_ev(node[1], v))
        return left if _truthy(left) else _stop(_ev(node[2], v))
    if k == "and":
        left = _stop(_ev(node[1], v))
        return _stop(_ev(node[2], v)) if _truthy(left) else left
    if k == "not":
        return not _truthy(_stop(_ev(node[1], v)))
    if k == "cmp":
        a, b = _stop(_ev(node[2], v)), _stop(_ev(node[3], v))
        op = node[1]
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
            return None
        return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
    if k == "mshash":
        if v is None:
            return None
        return {key: _stop(_ev(e, v)) for key, e in node[1]}
    if k == "mslist":
        if v is None:
            return None
        return [_stop(_ev(e, v)) for e in node[1]]
    if k == "call":
        return _fcall(node[1], node[2], v)
    if k == "expref":
        raise JMESError("jmespath: expression reference outside function")
    raise JMESError(f"jmespath: bad node {k}")


class _Proj:
    """A projection: subsequent ops map over elements, nulls dropped."""

    def __init__(self, items):
        self.items = items

    def map(self, fn):
        out = []
        for x in self.items:
            r = fn(x)
            r = _stop(r)
            if r is not None:
                out.append(r)
        return _Proj(out)


def _stop(v):
    return v.items if isinstance(v, _Proj) else v


def _truthy(v):
    v = _stop(v)
    if v is None or v is False:
        return False
    if v == "" or v == [] or v == {}:
        return False
    return True


def _fcall(name, args, v):
    def ev(i):
        return _stop(_ev(args[i], v))

    if name == "length":
        return len(ev(0))
    if name == "keys":
        return sorted(ev(0).keys())
    if name == "values":
        d = ev(0)
        return [d[k] for k in sorted(d)]
    if name == "sum":
        vals = ev(0)
        s = sum(vals)
        return int(s) if all(isinstance(x, int) for x in vals) else s
    if name == "avg":
        vals = ev(0)
        return sum(vals) / len(vals) if vals else None
    if name in ("min", "max"):
        vals = ev(0)
        return (min if name == "min" else max)(vals) if vals else None
    if name == "abs":
        return abs(ev(0))
    if name == "ceil":
        return math.ceil(ev(0))
    if name == "floor":
        return math.floor(ev(0))
    if name == "merge":
        out = {}
        for i in range(len(args)):
            out.update(ev(i))
        return out
    if name == "contains":
        return ev(1) in ev(0)
    if name == "join":
        return ev(0).join(ev(1))
    if name == "split":
        return ev(0).split(ev(1))
    if name == "starts_with":
        return ev(0).startswith(ev(1))
    if name == "ends_with":
        return ev(0).endswith(ev(1))
    if name == "reverse":
        x = ev(0)
        return x[::-1]
    if name == "sort":
        return sorted(ev(0))
    if name == "sort_by":
        arr = ev(0)
        ref = args[1]
        if ref[0] != "expref":
            raise JMESError("jmespath: sort_by needs &expr")
        return sorted(arr, key=lambda x: _stop(_ev(ref[1], x)))
    if name == "map":
        ref = args[0]
        if ref[0] != "expref":
            raise JMESError("jmespath: map needs &expr")
        return [_stop(_ev(ref[1], x)) for x in ev(1)]
    if name == "to_string":
        x = ev(0)
        return x if isinstance(x, str) else json.dumps(
            x, separators=(",", ":"), sort_keys=True)
    if name == "to_number":
        x = ev(0)
        if isinstance(x, (int, float)):
            return x
        try:
            f = float(x)
            return int(f) if f == math.floor(f) else f
        except (TypeError, ValueError):
            return None
    if name == "type":
        x = ev(0)
        return {type(None): "null", bool: "boolean", int: "number",
                float: "number", str: "string", list: "array",
                dict: "object"}[type(x)]
    if name == "not_null":
        for i in range(len(args)):
            x = ev(i)
            if x is not None:
                return x
        return None
    raise JMESError(f"jmespath: unknown function {name}")


class JMESPath:
    def __init__(self, src: str):
        self.ast = _P(src).parse()

    def search(self, value):
        return _stop(_ev(self.ast, value))


def search(expr: str, value):
    return JMESPath(expr).search(value)
