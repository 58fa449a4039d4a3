"""AWK-subset interpreter — the ``awk`` processor's language.

Reference: internal/impl/awk/processor.go (delegates to goawk and
registers bento's custom functions). This implements the subset those
configs use: ``BEGIN``/``END``/pattern-action rules, ``print``,
``if``/``else``, ``while``/``for``, assignments (``=``, ``+=`` …,
``++``/``--``), AWK expression semantics (string/number duck typing,
juxtaposition concatenation, uninitialised vars as ""/0, %.6g number
formatting), ``$0``/``$N`` fields, the common builtins and every bento
custom function (json_get/set/append/delete/length/type,
metadata_get/set, base64, timestamps, print_log).

Codecs (processor.go:39-86): ``none`` feeds the whole payload as one
record, ``text`` feeds each line, ``json`` feeds an empty record with
variables pre-set from the flattened JSON document (path separators →
underscores).
"""

from __future__ import annotations

import base64
import json
import math
import re
import time


class AWKError(ValueError):
    pass


_TOK = re.compile(r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>\n+)
  | (?P<num>\d+(\.\d+)?([eE][+-]?\d+)?)
  | (?P<str>"(\\.|[^"\\])*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\+\+|--|\+=|-=|\*=|/=|%=|==|!=|<=|>=|&&|\|\||[-+*/%!<>=(){}$;,\[\]])
""", re.X)


def _tokenize(src: str):
    toks, i = [], 0
    while i < len(src):
        m = _TOK.match(src, i)
        if not m:
            raise AWKError(f"awk: bad char {src[i]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "nl":
            toks.append(("nl", None))
        elif kind == "num":
            toks.append(("num", float(m.group())))
        elif kind == "str":
            toks.append(("str", json.loads(m.group().replace("\n", "\\n"))))
        elif kind == "name":
            toks.append(("name", m.group()))
        else:
            toks.append(("op", m.group()))
    toks.append(("eof", None))
    return toks


class _Parser:
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

    def at(self, kind, val=None):
        tok = self.peek()
        return tok[0] == kind and (val is None or tok[1] == val)

    def expect(self, kind, val=None):
        tok = self.next()
        if tok[0] != kind or (val is not None and tok[1] != val):
            raise AWKError(f"awk: expected {val or kind}, got {tok}")
        return tok

    def skip_nl(self):
        while self.at("nl") or self.at("op", ";"):
            self.next()

    def parse_program(self):
        rules = []
        self.skip_nl()
        while not self.at("eof"):
            if self.at("name", "BEGIN"):
                self.next()
                rules.append(("BEGIN", None, self.parse_block()))
            elif self.at("name", "END"):
                self.next()
                rules.append(("END", None, self.parse_block()))
            elif self.at("op", "{"):
                rules.append(("main", None, self.parse_block()))
            else:
                pat = self.parse_expr()
                rules.append(("main", pat, self.parse_block()
                              if self.at("op", "{") else
                              [("print", [])]))
            self.skip_nl()
        return rules

    def parse_block(self):
        self.expect("op", "{")
        stmts = []
        self.skip_nl()
        while not self.at("op", "}"):
            stmts.append(self.parse_stmt())
            self.skip_nl()
        self.expect("op", "}")
        return stmts

    def parse_stmt(self):
        if self.at("op", "{"):
            return ("block", self.parse_block())
        if self.at("name", "print"):
            self.next()
            exprs = []
            if not (self.at("nl") or self.at("op", ";") or
                    self.at("op", "}")):
                exprs.append(self.parse_expr())
                while self.at("op", ","):
                    self.next()
                    exprs.append(self.parse_expr())
            return ("print", exprs)
        if self.at("name", "if"):
            self.next()
            self.expect("op", "(")
            cond = self.parse_expr()
            self.expect("op", ")")
            self.skip_nl()
            then = self.parse_stmt()
            els = None
            save = self.i
            self.skip_nl()
            if self.at("name", "else"):
                self.next()
                self.skip_nl()
                els = self.parse_stmt()
            else:
                self.i = save
            return ("if", cond, then, els)
        if self.at("name", "while"):
            self.next()
            self.expect("op", "(")
            cond = self.parse_expr()
            self.expect("op", ")")
            self.skip_nl()
            return ("while", cond, self.parse_stmt())
        if self.at("name", "for"):
            self.next()
            self.expect("op", "(")
            init = self.parse_stmt()
            self.expect("op", ";")
            cond = self.parse_expr()
            self.expect("op", ";")
            post = self.parse_stmt()
            self.expect("op", ")")
            self.skip_nl()
            return ("for", init, cond, post, self.parse_stmt())
        # assignment or expression
        if self.at("name") and self.peek(1)[0] == "op" and \
                self.peek(1)[1] in ("=", "+=", "-=", "*=", "/=", "%="):
            name = self.next()[1]
            op = self.next()[1]
            return ("assign", name, op, self.parse_expr())
        if self.at("name") and self.peek(1) == ("op", "["):
            # array element assignment arr[idx] = v
            name = self.next()[1]
            self.next()
            idx = self.parse_expr()
            self.expect("op", "]")
            if self.at("op", "=") or (self.at("op") and
                                      self.peek()[1] in ("+=", "-=")):
                op = self.next()[1]
                return ("aassign", name, idx, op, self.parse_expr())
            raise AWKError("awk: array read outside expression")
        return ("expr", self.parse_expr())

    # -- expressions ---------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at("op", "||"):
            self.next()
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.at("op", "&&"):
            self.next()
            left = ("and", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_concat()
        if self.at("op") and self.peek()[1] in ("==", "!=", "<", ">",
                                                "<=", ">="):
            op = self.next()[1]
            return ("cmp", op, left, self.parse_concat())
        return left

    def parse_concat(self):
        left = self.parse_add()
        parts = [left]
        while self.peek()[0] in ("str", "num", "name") or \
                self.at("op", "(") or self.at("op", "$"):
            parts.append(self.parse_add())
        return parts[0] if len(parts) == 1 else ("concat", parts)

    def parse_add(self):
        left = self.parse_mul()
        while self.at("op", "+") or self.at("op", "-"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_unary()
        while self.at("op") and self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            left = ("arith", op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at("op", "!"):
            self.next()
            return ("not", self.parse_unary())
        if self.at("op", "-"):
            self.next()
            return ("neg", self.parse_unary())
        if self.at("op", "++") or self.at("op", "--"):
            op = self.next()[1]
            name = self.expect("name")[1]
            return ("incdec", name, op, True)
        return self.parse_postfix()

    def parse_postfix(self):
        node = self.parse_primary()
        if node[0] == "var" and (self.at("op", "++") or
                                 self.at("op", "--")):
            op = self.next()[1]
            return ("incdec", node[1], op, False)
        return node

    def parse_primary(self):
        tok = self.peek()
        if tok[0] == "num":
            self.next()
            return ("lit", tok[1])
        if tok[0] == "str":
            self.next()
            return ("lit", tok[1])
        if tok == ("op", "$"):
            self.next()
            return ("field", self.parse_primary())
        if tok == ("op", "("):
            self.next()
            e = self.parse_expr()
            self.expect("op", ")")
            return e
        if tok[0] == "name":
            self.next()
            if self.at("op", "("):
                self.next()
                args = []
                if not self.at("op", ")"):
                    args.append(self.parse_expr())
                    while self.at("op", ","):
                        self.next()
                        args.append(self.parse_expr())
                self.expect("op", ")")
                return ("call", tok[1], args)
            if self.at("op", "["):
                self.next()
                idx = self.parse_expr()
                self.expect("op", "]")
                return ("aref", tok[1], idx)
            return ("var", tok[1])
        raise AWKError(f"awk: unexpected token {tok}")


# ------------------------------------------------------------- evaluator

class _Strnum(str):
    """A string that came from input (a field) — POSIX 'strnum':
    numeric-looking strnums compare NUMERICALLY against each other
    and against numbers, while string literals always compare as
    strings (goawk semantics)."""


_NUMSTR_RE = re.compile(
    r"\s*[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+)\s*$")


def _looks_num(v) -> bool:
    return bool(_NUMSTR_RE.match(v))


def _num(v) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    m = re.match(r"\s*[+-]?(\d+\.?\d*([eE][+-]?\d+)?|\.\d+)", str(v))
    return float(m.group()) if m else 0.0


def _str(v) -> str:
    if isinstance(v, float):
        if v == math.floor(v) and abs(v) < 1e16:
            return str(int(v))
        return "%.6g" % v
    return str(v)


def _truthy(v) -> bool:
    if isinstance(v, (int, float)):
        return v != 0
    return v != ""


class AWK:
    """Compiled AWK program executable against one message."""

    def __init__(self, src: str, codec: str = "text"):
        self.rules = _Parser(src).parse_program()
        self.codec = codec

    def run_message(self, content: bytes, metadata: dict,
                    doc=None) -> tuple[bytes, dict, object]:
        """Execute over one message → (new_content, metadata, doc).
        If the program prints nothing, content is unchanged (doc
        mutations via json_set* still apply)."""
        meta = dict(metadata)
        state = {"doc": doc, "meta": meta, "content": content,
                 "doc_dirty": False, "out": []}
        env: dict = {}
        if self.codec == "json":
            if state["doc"] is None:
                try:
                    state["doc"] = json.loads(content.decode())
                except ValueError:
                    state["doc"] = {}
            for path, val in _flatten("", state["doc"]).items():
                env[re.sub(r"[.-]", "_", path)] = val
            records = [""]
        elif self.codec == "none":
            records = [content.decode("utf-8", "replace")]
        else:  # text
            text = content.decode("utf-8", "replace")
            # a trailing newline is a record TERMINATOR (goawk/POSIX):
            # it must not create a phantom empty final record
            if text.endswith("\n"):
                text = text[:-1]
            records = text.split("\n")

        for kind, pat, stmts in self.rules:
            if kind == "BEGIN":
                self._exec_block(stmts, env, "", state)
        for rec in records:
            env["NF"] = float(len(rec.split()))
            for kind, pat, stmts in self.rules:
                if kind != "main":
                    continue
                if pat is None or _truthy(self._eval(pat, env, rec,
                                                     state)):
                    self._exec_block(stmts, env, rec, state)
        for kind, pat, stmts in self.rules:
            if kind == "END":
                self._exec_block(stmts, env, "", state)

        printed = "\n".join(state["out"])
        if printed:
            new_content = printed.encode()
        elif state["doc_dirty"]:
            new_content = json.dumps(
                state["doc"], separators=(",", ":"),
                sort_keys=True).encode()
        else:
            new_content = content
        return new_content, meta, state["doc"]

    # -- statements ----------------------------------------------------
    def _exec_block(self, stmts, env, rec, state):
        for s in stmts:
            self._exec(s, env, rec, state)

    def _exec(self, s, env, rec, state):
        k = s[0]
        if k == "block":
            self._exec_block(s[1], env, rec, state)
        elif k == "print":
            vals = [_str(self._eval(e, env, rec, state)) for e in s[1]]
            state["out"].append(" ".join(vals) if vals else rec)
        elif k == "if":
            if _truthy(self._eval(s[1], env, rec, state)):
                self._exec(s[2], env, rec, state)
            elif s[3] is not None:
                self._exec(s[3], env, rec, state)
        elif k == "while":
            guard = 0
            while _truthy(self._eval(s[1], env, rec, state)):
                self._exec(s[2], env, rec, state)
                guard += 1
                if guard > 1_000_000:
                    raise AWKError("awk: loop bound exceeded")
        elif k == "for":
            self._exec(s[1], env, rec, state)
            guard = 0
            while _truthy(self._eval(s[2], env, rec, state)):
                self._exec(s[4], env, rec, state)
                self._exec(s[3], env, rec, state)
                guard += 1
                if guard > 1_000_000:
                    raise AWKError("awk: loop bound exceeded")
        elif k == "assign":
            _, name, op, expr = s
            v = self._eval(expr, env, rec, state)
            if op == "=":
                env[name] = v
            else:
                cur = _num(env.get(name, 0))
                env[name] = {"+=": cur + _num(v), "-=": cur - _num(v),
                             "*=": cur * _num(v),
                             "/=": cur / _num(v) if _num(v) else 0.0,
                             "%=": math.fmod(cur, _num(v))
                             if _num(v) else 0.0}[op]
        elif k == "aassign":
            _, name, idxe, op, expr = s
            arr = env.setdefault(name, {})
            if not isinstance(arr, dict):
                arr = env[name] = {}
            idx = _str(self._eval(idxe, env, rec, state))
            v = self._eval(expr, env, rec, state)
            if op == "=":
                arr[idx] = v
            else:
                arr[idx] = _num(arr.get(idx, 0)) + \
                    (_num(v) if op == "+=" else -_num(v))
        elif k == "expr":
            self._eval(s[1], env, rec, state)
        else:
            raise AWKError(f"awk: bad statement {k}")

    # -- expressions ---------------------------------------------------
    def _eval(self, e, env, rec, state):
        k = e[0]
        if k == "lit":
            return e[1]
        if k == "var":
            return env.get(e[1], "")
        if k == "aref":
            arr = env.get(e[1], {})
            return arr.get(_str(self._eval(e[2], env, rec, state)), "") \
                if isinstance(arr, dict) else ""
        if k == "field":
            n = int(_num(self._eval(e[1], env, rec, state)))
            if n == 0:
                return _Strnum(rec)
            parts = rec.split()
            return _Strnum(parts[n - 1]) \
                if 1 <= n <= len(parts) else _Strnum("")
        if k == "concat":
            return "".join(_str(self._eval(p, env, rec, state))
                           for p in e[1])
        if k == "arith":
            a = _num(self._eval(e[2], env, rec, state))
            b = _num(self._eval(e[3], env, rec, state))
            if e[1] == "+":
                return a + b
            if e[1] == "-":
                return a - b
            if e[1] == "*":
                return a * b
            if e[1] == "/":
                if b == 0:
                    raise AWKError("awk: division by zero")
                return a / b
            return math.fmod(a, b) if b else 0.0
        if k == "cmp":
            a = self._eval(e[2], env, rec, state)
            b = self._eval(e[3], env, rec, state)
            # POSIX strnum rule: two numeric-looking FIELD values
            # (or a field vs a number) compare numerically; string
            # literals force string comparison ("10" > "9" on $1/$2
            # of "10 9" must be numeric true, not string false)
            a_sn = isinstance(a, _Strnum) and _looks_num(a)
            b_sn = isinstance(b, _Strnum) and _looks_num(b)
            a_num = isinstance(a, float) or a_sn
            b_num = isinstance(b, float) or b_sn
            if (isinstance(a, float) and isinstance(b, float)) or \
                    (a_num and b_sn) or (a_sn and b_num):
                a, b = _num(a), _num(b)
            elif isinstance(a, float) or isinstance(b, float):
                a, b = _num(a), _num(b)
            else:
                a, b = _str(a), _str(b)
            return 1.0 if {"==": a == b, "!=": a != b, "<": a < b,
                           ">": a > b, "<=": a <= b,
                           ">=": a >= b}[e[1]] else 0.0
        if k == "and":
            return 1.0 if _truthy(self._eval(e[1], env, rec, state)) and \
                _truthy(self._eval(e[2], env, rec, state)) else 0.0
        if k == "or":
            return 1.0 if _truthy(self._eval(e[1], env, rec, state)) or \
                _truthy(self._eval(e[2], env, rec, state)) else 0.0
        if k == "not":
            return 0.0 if _truthy(self._eval(e[1], env, rec, state)) \
                else 1.0
        if k == "neg":
            return -_num(self._eval(e[1], env, rec, state))
        if k == "incdec":
            _, name, op, prefix = e
            cur = _num(env.get(name, 0))
            new = cur + (1 if op == "++" else -1)
            env[name] = new
            return new if prefix else cur
        if k == "call":
            return self._call(e[1], [self._eval(a, env, rec, state)
                                     for a in e[2]], state)
        raise AWKError(f"awk: bad expr {k}")

    # -- functions -----------------------------------------------------
    def _call(self, name, args, state):
        # AWK builtins
        if name == "length":
            return float(len(_str(args[0]) if args else ""))
        if name == "substr":
            s = _str(args[0])
            m = int(_num(args[1]))
            if len(args) > 2:
                # POSIX: clamp start to 1 and shrink the count by the
                # clamped amount (substr("hello",0,3) == "he"); a raw
                # s[m-1:...] slice with m<1 wrapped around the end
                end = m + int(_num(args[2]))  # 1-based exclusive
                start = max(m, 1)
                return s[start - 1:end - 1] if end > start else ""
            return s[max(m, 1) - 1:]
        if name == "index":
            return float(_str(args[0]).find(_str(args[1])) + 1)
        if name == "tolower":
            return _str(args[0]).lower()
        if name == "toupper":
            return _str(args[0]).upper()
        if name == "sprintf":
            fmt = _str(args[0])
            conv = []
            spec = re.findall(r"%[-+ 0-9.#]*[sdfgeExXoci]", fmt)
            for sp, a in zip(spec, args[1:]):
                c = sp[-1]
                if c in "dioxXc":
                    conv.append(int(_num(a)))
                elif c in "fgeE":
                    conv.append(_num(a))
                else:
                    conv.append(_str(a))
            try:
                return fmt % tuple(conv)
            except (TypeError, ValueError) as ex:
                raise AWKError(f"awk: sprintf: {ex}")
        if name == "int":
            return float(int(_num(args[0])))
        if name == "split":
            # split(s, arr, sep) — arr passed by name unsupported; rare
            raise AWKError("awk: split with array refs unsupported")

        # bento custom functions (processor.go:505-720). The json_*
        # functions operate on the message payload regardless of codec,
        # parsing it lazily on first use.
        if state["doc"] is None and name.startswith("json_"):
            try:
                state["doc"] = json.loads(
                    state["content"].decode("utf-8", "replace"))
            except ValueError:
                state["doc"] = None
        doc = state["doc"]

        def ensure_doc():
            if state["doc"] is None:
                state["doc"] = {}
            return state["doc"]

        if name == "metadata_get":
            return _str(state["meta"].get(_str(args[0]), ""))
        if name == "metadata_set":
            state["meta"][_str(args[0])] = _str(args[1])
            return 0.0
        if name == "json_get":
            cur = doc
            for seg in _str(args[0]).split("."):
                if isinstance(cur, dict) and seg in cur:
                    cur = cur[seg]
                else:
                    return "null"
            return json.dumps(cur) if isinstance(cur, (dict, list)) \
                else _str(cur) if not isinstance(cur, bool) \
                else ("true" if cur else "false")
        if name in ("json_set", "json_set_int", "json_set_float",
                    "json_set_bool"):
            val = {"json_set": _str(args[1]),
                   "json_set_int": int(_num(args[1])),
                   "json_set_float": _num(args[1]),
                   "json_set_bool": _truthy(args[1])}[name]
            _set_path(ensure_doc(), _str(args[0]).split("."), val)
            state["doc_dirty"] = True
            return 0.0
        if name in ("json_append", "json_append_int",
                    "json_append_float", "json_append_bool"):
            val = {"json_append": _str(args[1]),
                   "json_append_int": int(_num(args[1])),
                   "json_append_float": _num(args[1]),
                   "json_append_bool": _truthy(args[1])}[name]
            d = ensure_doc()
            segs = _str(args[0]).split(".")
            cur = d
            for seg in segs[:-1]:
                cur = cur.setdefault(seg, {})
            tgt = cur.get(segs[-1])
            if not isinstance(tgt, list):
                tgt = [] if tgt is None else [tgt]
            tgt.append(val)
            cur[segs[-1]] = tgt
            state["doc_dirty"] = True
            return 0.0
        if name == "json_delete":
            d = ensure_doc()
            segs = _str(args[0]).split(".")
            cur = d
            for seg in segs[:-1]:
                cur = cur.get(seg) if isinstance(cur, dict) else None
                if cur is None:
                    return 0.0
            if isinstance(cur, dict):
                cur.pop(segs[-1], None)
                state["doc_dirty"] = True
            return 0.0
        if name == "json_length":
            cur = doc
            for seg in _str(args[0]).split("."):
                cur = cur.get(seg) if isinstance(cur, dict) else None
            return float(len(cur)) if isinstance(cur, (list, str,
                                                       dict)) else 0.0
        if name == "json_type":
            cur = doc
            for seg in _str(args[0]).split("."):
                if isinstance(cur, dict) and seg in cur:
                    cur = cur[seg]
                else:
                    return "undefined"
            return {type(None): "null", bool: "bool", int: "int",
                    float: "float", str: "string", list: "array",
                    dict: "object"}[type(cur)]
        if name == "create_json_object":
            return json.dumps({_str(args[i]): _str(args[i + 1])
                               for i in range(0, len(args) - 1, 2)},
                              separators=(",", ":"), sort_keys=True)
        if name == "create_json_array":
            return json.dumps([_str(a) for a in args],
                              separators=(",", ":"))
        if name == "base64_encode":
            return base64.b64encode(_str(args[0]).encode()).decode()
        if name == "base64_decode":
            return base64.b64decode(_str(args[0])).decode(
                "utf-8", "replace")
        if name == "timestamp_unix":
            if args:
                import datetime as _dt

                s = _str(args[0])
                try:
                    dt = _dt.datetime.fromisoformat(
                        s.replace("Z", "+00:00"))
                    return float(int(dt.timestamp()))
                except ValueError:
                    return 0.0
            return float(int(time.time()))
        if name == "timestamp_unix_nano":
            return float(int(time.time() * 1e9))
        if name == "timestamp_format":
            import datetime as _dt

            ts = int(_num(args[0]))
            fmt = _str(args[1]) if len(args) > 1 else "2006-01-02T15:04:05Z07:00"
            from bento_ray.blobl.methods import m_format_timestamp

            return m_format_timestamp(ts, fmt)
        if name == "print_log":
            return 0.0
        raise AWKError(f"awk: unknown function {name}")


def _flatten(path, data):
    out = {}
    if isinstance(data, dict):
        for k, v in data.items():
            p = f"{path}.{k}" if path else k
            out.update(_flatten(p, v))
    elif isinstance(data, list):
        for x in data:
            out.update(_flatten(path, x))
    else:
        if isinstance(data, bool):
            out[path] = "true" if data else "false"
        elif data is None:
            out[path] = "null"
        elif isinstance(data, float) and data == math.floor(data):
            out[path] = str(int(data))
        else:
            out[path] = str(data)
    return out


def _set_path(d, segs, val):
    cur = d
    for seg in segs[:-1]:
        nxt = cur.get(seg)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[seg] = nxt
        cur = nxt
    cur[segs[-1]] = val
