"""JavaScript-subset engine — the ``javascript`` processor's language.

Reference: internal/impl/javascript/{processor,vm,functions}.go (the
reference embeds goja, a full ES5.1+ interpreter, and exposes a
``bento`` host object with the ``v0_*`` message functions plus a
nodejs-style ``require`` registry). This implements the ES5.1 subset
those processors realistically use, executed per message exactly like
``vmRunner.Run`` (vm.go:123-143):

- statements: ``var``/``let``/``const``, ``if``/``else``, ``while``,
  ``do``/``while``, ``for`` / ``for..in`` / ``for..of``, ``switch``,
  ``try``/``catch``/``finally``, ``throw``, ``return``, ``break``,
  ``continue``, function declarations, blocks, ASI (newline-terminated
  statements without semicolons).
- expressions: arrow functions (expression and block bodies, IIFEs),
  function expressions and closures, ternary, ``&&``/``||``, bitwise,
  loose/strict (in)equality, relational + ``in``, arithmetic with JS
  string-concat ``+``, ``typeof``/``delete``/``void``/unary,
  pre/post ``++``/``--``, compound assignment, ``new``, member and
  index access, object/array literals (shorthand + computed keys +
  method shorthand), template literals with ``${}``.
- builtins: ``Object.keys/values/entries/assign``, ``JSON
  .parse/stringify``, ``Math``, ``Array.isArray/from``, ``parseInt``,
  ``parseFloat``, ``isNaN``, ``String``/``Number``/``Boolean``,
  ``Error`` (+ ``TypeError``/``RangeError``), ``console.log``, and the
  usual array/string/number methods.
- NOT implemented (parse/runtime error): regex literals, classes,
  generators/async, destructuring, spread, labels, ``with``, getters/
  setters, prototypes. These never appear in the reference's
  javascript-processor docs, examples, or tests.

Host-error parity (vm.go:60-66): a failing host function is thrown as
a plain JS STRING value (goja's ``panic(rt.ToValue(err.Error()))``),
so ``catch (e)`` observes the error text — the contract the
reference's error-handling test pins.

Numbers: JS has only doubles; goja exports integral doubles as int64
(vm.go parseArgs / goja Export). We mirror that by normalizing every
integral float result back to int, so ``Object.keys(x).length`` lands
in metadata as an int and marshals as ``2``, not ``2.0``.
"""

from __future__ import annotations

import json
import math


class JSError(ValueError):
    """A compile (parse) error in the source program."""


class JSThrow(Exception):
    """A thrown JS value propagating through the interpreter."""

    def __init__(self, value):
        super().__init__(to_string(value))
        self.value = value


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()

_KEYWORDS = {
    "var", "let", "const", "if", "else", "while", "do", "for", "function",
    "return", "break", "continue", "throw", "try", "catch", "finally",
    "switch", "case", "default", "new", "delete", "typeof", "void", "in",
    "of", "instanceof", "true", "false", "null", "undefined", "this",
}

_PUNCT = [
    "===", "!==", "**=", ">>>", "...", "=>", "==", "!=", "<=", ">=",
    "&&", "||", "++", "--", "+=", "-=", "*=", "/=", "%=", "&=", "|=",
    "^=", "**", "<<", ">>", "(", ")", "{", "}", "[", "]", ";", ",",
    ".", "?", ":", "=", "+", "-", "*", "/", "%", "<", ">", "!", "~",
    "&", "|", "^",
]

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "v": "\v", "0": "\0", "\n": ""}


class _Tok:
    __slots__ = ("kind", "value", "nl_before", "pos")

    def __init__(self, kind, value, nl_before, pos):
        self.kind = kind
        self.value = value
        self.nl_before = nl_before
        self.pos = pos


def _read_string(src, i, quote):
    out, i = [], i + 1
    while i < len(src):
        c = src[i]
        if c == quote:
            return "".join(out), i + 1
        if c == "\\":
            i += 1
            if i >= len(src):
                break
            e = src[i]
            if e == "u":
                if src[i + 1:i + 2] == "{":
                    j = src.index("}", i)
                    out.append(chr(int(src[i + 2:j], 16)))
                    i = j + 1
                else:
                    out.append(chr(int(src[i + 1:i + 5], 16)))
                    i += 5
            elif e == "x":
                out.append(chr(int(src[i + 1:i + 3], 16)))
                i += 3
            else:
                out.append(_ESCAPES.get(e, e))
                i += 1
        else:
            out.append(c)
            i += 1
    raise JSError("javascript: unterminated string literal")


def _tokenize(src: str):
    toks, i, nl = [], 0, False
    n = len(src)
    while i < n:
        c = src[i]
        if c in " \t\r":
            i += 1
            continue
        if c == "\n":
            nl = True
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise JSError("javascript: unterminated block comment")
            if "\n" in src[i:j]:
                nl = True
            i = j + 2
            continue
        if c.isdigit() or (c == "." and src[i + 1:i + 2].isdigit()):
            j = i
            if src.startswith(("0x", "0X"), i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                toks.append(_Tok("num", int(src[i:j], 16), nl, i))
            else:
                while j < n and (src[j].isdigit() or src[j] in ".eE" or
                                 (src[j] in "+-" and src[j - 1] in "eE")):
                    j += 1
                text = src[i:j]
                val = float(text) if any(ch in text for ch in ".eE") \
                    else int(text)
                toks.append(_Tok("num", _norm_num(val), nl, i))
            i, nl = j, False
            continue
        if c in "'\"":
            s, i = _read_string(src, i, c)
            toks.append(_Tok("str", s, nl, i))
            nl = False
            continue
        if c == "`":
            parts, buf, j = [], [], i + 1
            while j < n:
                if src[j] == "`":
                    break
                if src.startswith("${", j):
                    parts.append(("lit", "".join(buf)))
                    buf = []
                    depth, k = 1, j + 2
                    while k < n and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        k += 1
                    parts.append(("expr", src[j + 2:k - 1]))
                    j = k
                elif src[j] == "\\":
                    buf.append(_ESCAPES.get(src[j + 1], src[j + 1]))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSError("javascript: unterminated template literal")
            parts.append(("lit", "".join(buf)))
            toks.append(_Tok("template", parts, nl, i))
            i, nl = j + 1, False
            continue
        if c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            word = src[i:j]
            kind = "kw" if word in _KEYWORDS else "name"
            toks.append(_Tok(kind, word, nl, i))
            i, nl = j, False
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(_Tok("op", p, nl, i))
                i += len(p)
                break
        else:
            raise JSError(f"javascript: unexpected character {c!r}")
        nl = False
    toks.append(_Tok("eof", None, True, n))
    return toks


def _norm_num(v):
    """goja exports integral doubles as int64 — mirror that."""
    if isinstance(v, float) and v.is_integer() and abs(v) < 2 ** 53:
        return int(v)
    return v


class _Parser:
    def __init__(self, src: str):
        self.t = _tokenize(src)
        self.i = 0

    def peek(self, k=0):
        return self.t[min(self.i + k, len(self.t) - 1)]

    def next(self):
        tok = self.t[self.i]
        if tok.kind != "eof":
            self.i += 1
        return tok

    def at(self, kind, value=None):
        tok = self.peek()
        return tok.kind == kind and (value is None or tok.value == value)

    def expect(self, kind, value=None):
        tok = self.next()
        if tok.kind != kind or (value is not None and tok.value != value):
            raise JSError(
                f"javascript: expected {value or kind}, got "
                f"{tok.value!r} at offset {tok.pos}")
        return tok

    def eat(self, kind, value=None):
        if self.at(kind, value):
            self.next()
            return True
        return False

    # -- statements ---------------------------------------------------

    def parse_program(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.statement())
        return ("block", stmts)

    def semi(self):
        """Consume a statement terminator with ASI: an explicit ';',
        or a newline before the next token, or '}' / EOF."""
        if self.eat("op", ";"):
            return
        tok = self.peek()
        if tok.kind == "eof" or (tok.kind == "op" and tok.value == "}") \
                or tok.nl_before:
            return
        raise JSError(
            f"javascript: expected ';' before {tok.value!r} "
            f"at offset {tok.pos}")

    def statement(self):
        tok = self.peek()
        if tok.kind == "op" and tok.value == "{":
            return self.block()
        if tok.kind == "op" and tok.value == ";":
            self.next()
            return ("empty",)
        if tok.kind == "kw":
            kw = tok.value
            if kw in ("var", "let", "const"):
                s = self.var_decl()
                self.semi()
                return s
            if kw == "if":
                return self.if_stmt()
            if kw == "while":
                self.next()
                self.expect("op", "(")
                test = self.expression()
                self.expect("op", ")")
                return ("while", test, self.statement())
            if kw == "do":
                self.next()
                body = self.statement()
                self.expect("kw", "while")
                self.expect("op", "(")
                test = self.expression()
                self.expect("op", ")")
                self.semi()
                return ("dowhile", test, body)
            if kw == "for":
                return self.for_stmt()
            if kw == "function":
                self.next()
                name = self.expect("name").value
                params, body = self.func_rest()
                return ("funcdecl", name, params, body)
            if kw == "return":
                self.next()
                tok = self.peek()
                if tok.nl_before or (tok.kind == "op" and
                                     tok.value in (";", "}")) or \
                        tok.kind == "eof":
                    self.semi()
                    return ("return", None)
                arg = self.expression()
                self.semi()
                return ("return", arg)
            if kw == "break":
                self.next()
                self.semi()
                return ("break",)
            if kw == "continue":
                self.next()
                self.semi()
                return ("continue",)
            if kw == "throw":
                self.next()
                arg = self.expression()
                self.semi()
                return ("throw", arg)
            if kw == "try":
                return self.try_stmt()
            if kw == "switch":
                return self.switch_stmt()
        expr = self.expression()
        self.semi()
        return ("expr", expr)

    def block(self):
        self.expect("op", "{")
        stmts = []
        while not self.at("op", "}"):
            stmts.append(self.statement())
        self.expect("op", "}")
        return ("block", stmts)

    def var_decl(self):
        kind = self.next().value
        decls = []
        while True:
            name = self.expect("name").value
            init = None
            if self.eat("op", "="):
                init = self.assignment()
            decls.append((name, init))
            if not self.eat("op", ","):
                break
        return ("vardecl", kind, decls)

    def if_stmt(self):
        self.expect("kw", "if")
        self.expect("op", "(")
        test = self.expression()
        self.expect("op", ")")
        then = self.statement()
        other = None
        if self.eat("kw", "else"):
            other = self.statement()
        return ("if", test, then, other)

    def for_stmt(self):
        self.expect("kw", "for")
        self.expect("op", "(")
        init = None
        if not self.at("op", ";"):
            if self.at("kw", "var") or self.at("kw", "let") or \
                    self.at("kw", "const"):
                init = self.var_decl()
            else:
                init = ("expr", self.expression(no_in=True))
            tok = self.peek()
            if tok.kind == "kw" and tok.value in ("in", "of"):
                self.next()
                seq = self.expression()
                self.expect("op", ")")
                body = self.statement()
                if init[0] == "vardecl":
                    target = init[2][0][0]
                else:
                    if init[1][0] != "name":
                        raise JSError("javascript: bad for-in/of target")
                    target = init[1][1]
                return ("forin" if tok.value == "in" else "forof",
                        target, seq, body,
                        init[0] == "vardecl")
        self.expect("op", ";")
        test = None if self.at("op", ";") else self.expression()
        self.expect("op", ";")
        update = None if self.at("op", ")") else self.expression()
        self.expect("op", ")")
        return ("for", init, test, update, self.statement())

    def try_stmt(self):
        self.expect("kw", "try")
        block = self.block()
        param = handler = finalizer = None
        if self.eat("kw", "catch"):
            if self.eat("op", "("):
                param = self.expect("name").value
                self.expect("op", ")")
            handler = self.block()
        if self.eat("kw", "finally"):
            finalizer = self.block()
        if handler is None and finalizer is None:
            raise JSError("javascript: try without catch or finally")
        return ("try", block, param, handler, finalizer)

    def switch_stmt(self):
        self.expect("kw", "switch")
        self.expect("op", "(")
        disc = self.expression()
        self.expect("op", ")")
        self.expect("op", "{")
        cases = []
        while not self.at("op", "}"):
            if self.eat("kw", "case"):
                test = self.expression()
            else:
                self.expect("kw", "default")
                test = None
            self.expect("op", ":")
            body = []
            while not (self.at("op", "}") or self.at("kw", "case") or
                       self.at("kw", "default")):
                body.append(self.statement())
            cases.append((test, body))
        self.expect("op", "}")
        return ("switch", disc, cases)

    def func_rest(self):
        self.expect("op", "(")
        params = []
        while not self.at("op", ")"):
            params.append(self.expect("name").value)
            if not self.eat("op", ","):
                break
        self.expect("op", ")")
        return params, self.block()

    # -- expressions ----------------------------------------------------

    def expression(self, no_in=False):
        expr = self.assignment(no_in)
        while self.at("op", ","):
            self.next()
            expr = ("seq", expr, self.assignment(no_in))
        return expr

    def _try_arrow(self):
        """Detect ``(a, b) => ...`` / ``x => ...`` at the current token
        by scanning ahead; returns the node or None (no state change)."""
        tok = self.peek()
        if tok.kind == "name" and self.peek(1).kind == "op" and \
                self.peek(1).value == "=>":
            name = self.next().value
            self.next()
            return self.arrow_body([name])
        if tok.kind == "op" and tok.value == "(":
            depth, j = 0, self.i
            while True:
                t = self.t[j]
                if t.kind == "eof":
                    return None
                if t.kind == "op":
                    if t.value == "(":
                        depth += 1
                    elif t.value == ")":
                        depth -= 1
                        if depth == 0:
                            break
                j += 1
            after = self.t[j + 1]
            if not (after.kind == "op" and after.value == "=>"):
                return None
            self.next()
            params = []
            while not self.at("op", ")"):
                params.append(self.expect("name").value)
                if not self.eat("op", ","):
                    break
            self.expect("op", ")")
            self.expect("op", "=>")
            return self.arrow_body(params)
        return None

    def arrow_body(self, params):
        if self.at("op", "{"):
            return ("func", None, params, self.block(), True)
        return ("func", None, params,
                ("block", [("return", self.assignment())]), True)

    def assignment(self, no_in=False):
        arrow = self._try_arrow()
        if arrow is not None:
            return arrow
        left = self.ternary(no_in)
        tok = self.peek()
        if tok.kind == "op" and tok.value in (
                "=", "+=", "-=", "*=", "/=", "%=", "**=", "&=", "|=", "^="):
            if left[0] not in ("name", "member", "index"):
                raise JSError("javascript: invalid assignment target")
            self.next()
            right = self.assignment(no_in)
            return ("assign", tok.value, left, right)
        return left

    def ternary(self, no_in=False):
        test = self.binary(0, no_in)
        if self.eat("op", "?"):
            cons = self.assignment()
            self.expect("op", ":")
            return ("cond", test, cons, self.assignment(no_in))
        return test

    _BIN_LEVELS = [
        [("op", "||")],
        [("op", "&&")],
        [("op", "|")],
        [("op", "^")],
        [("op", "&")],
        [("op", "==="), ("op", "!=="), ("op", "=="), ("op", "!=")],
        [("op", "<"), ("op", ">"), ("op", "<="), ("op", ">="),
         ("kw", "in"), ("kw", "instanceof")],
        [("op", "<<"), ("op", ">>"), ("op", ">>>")],
        [("op", "+"), ("op", "-")],
        [("op", "*"), ("op", "/"), ("op", "%")],
    ]

    def binary(self, level, no_in=False):
        if level >= len(self._BIN_LEVELS):
            return self.exponent(no_in)
        left = self.binary(level + 1, no_in)
        while True:
            tok = self.peek()
            match = None
            for kind, val in self._BIN_LEVELS[level]:
                if tok.kind == kind and tok.value == val:
                    if val == "in" and no_in:
                        return left
                    match = val
                    break
            if match is None:
                return left
            self.next()
            right = self.binary(level + 1, no_in)
            if match in ("&&", "||"):
                left = ("logic", match, left, right)
            else:
                left = ("bin", match, left, right)

    def exponent(self, no_in=False):
        base = self.unary()
        if self.at("op", "**"):
            self.next()
            return ("bin", "**", base, self.exponent(no_in))
        return base

    def unary(self):
        tok = self.peek()
        if tok.kind == "op" and tok.value in ("!", "-", "+", "~"):
            self.next()
            return ("unary", tok.value, self.unary())
        if tok.kind == "op" and tok.value in ("++", "--"):
            self.next()
            target = self.unary()
            return ("update", tok.value, target, True)
        if tok.kind == "kw" and tok.value in ("typeof", "delete", "void"):
            self.next()
            return ("unary", tok.value, self.unary())
        return self.postfix()

    def postfix(self):
        expr = self.call_member(self.primary())
        tok = self.peek()
        if tok.kind == "op" and tok.value in ("++", "--") and \
                not tok.nl_before:
            self.next()
            return ("update", tok.value, expr, False)
        return expr

    def call_member(self, expr):
        while True:
            if self.at("op", "."):
                self.next()
                name = self.next()
                if name.kind not in ("name", "kw"):
                    raise JSError("javascript: expected property name")
                expr = ("member", expr, name.value)
            elif self.at("op", "["):
                self.next()
                key = self.expression()
                self.expect("op", "]")
                expr = ("index", expr, key)
            elif self.at("op", "("):
                self.next()
                args = []
                while not self.at("op", ")"):
                    args.append(self.assignment())
                    if not self.eat("op", ","):
                        break
                self.expect("op", ")")
                expr = ("call", expr, args)
            else:
                return expr

    def primary(self):
        tok = self.next()
        if tok.kind == "num":
            return ("lit", tok.value)
        if tok.kind == "str":
            return ("lit", tok.value)
        if tok.kind == "template":
            parts = []
            for kind, text in tok.value:
                if kind == "lit":
                    parts.append(("lit", text))
                else:
                    parts.append(_Parser(text).expression())
            return ("template", parts)
        if tok.kind == "name":
            return ("name", tok.value)
        if tok.kind == "kw":
            if tok.value == "true":
                return ("lit", True)
            if tok.value == "false":
                return ("lit", False)
            if tok.value == "null":
                return ("lit", None)
            if tok.value == "undefined":
                return ("lit", UNDEFINED)
            if tok.value == "this":
                return ("this",)
            if tok.value == "function":
                name = None
                if self.at("name"):
                    name = self.next().value
                params, body = self.func_rest()
                return ("func", name, params, body, False)
            if tok.value == "new":
                callee = self.call_member_no_call(self.primary())
                args = []
                if self.eat("op", "("):
                    while not self.at("op", ")"):
                        args.append(self.assignment())
                        if not self.eat("op", ","):
                            break
                    self.expect("op", ")")
                return self.call_member(("new", callee, args))
            if tok.value in ("typeof", "delete", "void"):
                return ("unary", tok.value, self.unary())
        if tok.kind == "op":
            if tok.value == "(":
                expr = self.expression()
                self.expect("op", ")")
                return expr
            if tok.value == "[":
                items = []
                while not self.at("op", "]"):
                    items.append(self.assignment())
                    if not self.eat("op", ","):
                        break
                self.expect("op", "]")
                return ("array", items)
            if tok.value == "{":
                props = []
                while not self.at("op", "}"):
                    props.append(self.obj_prop())
                    if not self.eat("op", ","):
                        break
                self.expect("op", "}")
                return ("object", props)
        raise JSError(
            f"javascript: unexpected token {tok.value!r} at offset "
            f"{tok.pos}")

    def call_member_no_call(self, expr):
        while True:
            if self.at("op", "."):
                self.next()
                expr = ("member", expr, self.expect("name").value)
            elif self.at("op", "["):
                self.next()
                key = self.expression()
                self.expect("op", "]")
                expr = ("index", expr, key)
            else:
                return expr

    def obj_prop(self):
        tok = self.next()
        if tok.kind in ("name", "kw", "str"):
            key = ("lit", tok.value)
        elif tok.kind == "num":
            key = ("lit", to_string(tok.value))
        elif tok.kind == "op" and tok.value == "[":
            key = self.expression()
            self.expect("op", "]")
        else:
            raise JSError("javascript: bad object literal key")
        if self.at("op", "("):          # method shorthand
            params, body = self.func_rest()
            return (key, ("func", None, params, body, False))
        if self.eat("op", ":"):
            return (key, self.assignment())
        if tok.kind == "name":          # shorthand {a}
            return (key, ("name", tok.value))
        raise JSError("javascript: bad object literal property")


# ---------------------------------------------------------------------------
# Runtime values and coercions
# ---------------------------------------------------------------------------


class JSFunction:
    __slots__ = ("name", "params", "body", "scope", "is_arrow", "this")

    def __init__(self, name, params, body, scope, is_arrow, this=UNDEFINED):
        self.name = name or ""
        self.params = params
        self.body = body
        self.scope = scope
        self.is_arrow = is_arrow
        self.this = this


class NativeFunction:
    __slots__ = ("name", "fn")

    def __init__(self, name, fn):
        self.name = name
        self.fn = fn                      # fn(args: list) -> value


class _Bound:
    __slots__ = ("obj", "fn")

    def __init__(self, obj, fn):
        self.obj = obj
        self.fn = fn                      # fn(obj, args) -> value


def truthy(v) -> bool:
    if v is None or v is UNDEFINED:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0 and v == v
    if isinstance(v, str):
        return v != ""
    return True


def to_number(v):
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if v is None:
        return 0
    if v is UNDEFINED:
        return math.nan
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0
        try:
            if s.startswith(("0x", "0X")):
                return int(s, 16)
            return _norm_num(float(s))
        except ValueError:
            return math.nan
    return math.nan


def to_string(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _num_str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if x is None or x is UNDEFINED
                        else to_string(x) for x in v)
    if isinstance(v, dict):
        if v.get("__is_error__"):
            return f"{v.get('name', 'Error')}: {v.get('message', '')}"
        return "[object Object]"
    if isinstance(v, (JSFunction, NativeFunction, _Bound)):
        return f"function {getattr(v, 'name', '')}() {{ [native] }}"
    return str(v)


def _num_str(v) -> str:
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == math.inf:
            return "Infinity"
        if v == -math.inf:
            return "-Infinity"
        if v.is_integer() and abs(v) < 2 ** 53:
            return str(int(v))
        return repr(v)
    return str(v)


def strict_eq(a, b) -> bool:
    if a is UNDEFINED or b is UNDEFINED:
        return a is b
    if a is None or b is None:
        return a is b
    an = isinstance(a, (int, float)) and not isinstance(a, bool)
    bn = isinstance(b, (int, float)) and not isinstance(b, bool)
    if an and bn:
        return a == b
    if type(a) is not type(b) and not (an and bn):
        if isinstance(a, bool) != isinstance(b, bool):
            return False
    if isinstance(a, (list, dict)):
        return a is b
    return type(a) is type(b) and a == b


def loose_eq(a, b) -> bool:
    if (a is None or a is UNDEFINED) and (b is None or b is UNDEFINED):
        return True
    if a is None or a is UNDEFINED or b is None or b is UNDEFINED:
        return False
    an = isinstance(a, (int, float)) and not isinstance(a, bool)
    bn = isinstance(b, (int, float)) and not isinstance(b, bool)
    if an and bn:
        return a == b
    if isinstance(a, bool):
        return loose_eq(1 if a else 0, b)
    if isinstance(b, bool):
        return loose_eq(a, 1 if b else 0)
    if an and isinstance(b, str):
        return a == to_number(b)
    if isinstance(a, str) and bn:
        return to_number(a) == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, (list, dict)) and isinstance(b, (list, dict)):
        return a is b
    if isinstance(a, (list, dict)):
        return loose_eq(to_string(a) if isinstance(a, list) else a, b) \
            if isinstance(a, list) and (bn or isinstance(b, str)) else False
    if isinstance(b, (list, dict)):
        return loose_eq(a, to_string(b)) \
            if isinstance(b, list) and (an or isinstance(a, str)) else False
    return False


def js_typeof(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (JSFunction, NativeFunction, _Bound)):
        return "function"
    return "object"                       # incl. null, arrays, dicts


def js_json_stringify(v, indent=None) -> str:
    def conv(x):
        if x is UNDEFINED or isinstance(
                x, (JSFunction, NativeFunction, _Bound)):
            return _SKIP
        if isinstance(x, float):
            if x != x or math.isinf(x):
                return None
            return _norm_num(x)
        if isinstance(x, list):
            return [None if (c := conv(i)) is _SKIP else c for i in x]
        if isinstance(x, dict):
            return {k: c for k, i in x.items()
                    if (c := conv(i)) is not _SKIP}
        return x

    _SKIP = object()
    out = conv(v)
    if out is _SKIP:
        return "undefined"
    return json.dumps(out, separators=(",", ":") if indent is None
                      else (",", ": "), indent=indent, ensure_ascii=False)


# ---------------------------------------------------------------------------
# Scopes
# ---------------------------------------------------------------------------


class Scope:
    __slots__ = ("vars", "parent", "is_function", "consts")

    def __init__(self, parent=None, is_function=False):
        self.vars = {}
        self.parent = parent
        self.is_function = is_function
        self.consts = set()

    def declare(self, name, value, kind):
        if kind == "var":
            scope = self
            while not scope.is_function and scope.parent is not None:
                scope = scope.parent
            scope.vars[name] = value
        else:
            self.vars[name] = value
            if kind == "const":
                self.consts.add(name)

    def get(self, name):
        scope = self
        while scope is not None:
            if name in scope.vars:
                return scope.vars[name]
            scope = scope.parent
        raise JSThrow(f"ReferenceError: {name} is not defined")

    def has(self, name):
        scope = self
        while scope is not None:
            if name in scope.vars:
                return True
            scope = scope.parent
        return False

    def set(self, name, value):
        scope = self
        while scope is not None:
            if name in scope.vars:
                if name in scope.consts:
                    raise JSThrow(
                        f"TypeError: assignment to constant variable "
                        f"{name}")
                scope.vars[name] = value
                return
            scope = scope.parent
        # sloppy-mode implicit global
        scope = self
        while scope.parent is not None:
            scope = scope.parent
        scope.vars[name] = value


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


# ---------------------------------------------------------------------------
# Builtin method tables
# ---------------------------------------------------------------------------


def _arg(args, i, default=UNDEFINED):
    return args[i] if i < len(args) else default


def _int_arg(args, i, default):
    v = _arg(args, i, None)
    if v is None or v is UNDEFINED:
        return default
    n = to_number(v)
    return default if isinstance(n, float) and n != n else int(n)


def _slice_idx(n, v, default):
    if v is UNDEFINED:
        return default
    i = int(to_number(v)) if to_number(v) == to_number(v) else 0
    return max(n + i, 0) if i < 0 else min(i, n)


class Interp:
    """One engine instance ≈ one goja.Runtime: a global scope with the
    standard builtins plus caller-provided host objects/functions."""

    def __init__(self, host=None, logger=None):
        self.globals = Scope(is_function=True)
        self.logger = logger
        g = self.globals.vars
        g["Object"] = {
            "keys": NativeFunction("keys", self._object_keys),
            "values": NativeFunction("values", self._object_values),
            "entries": NativeFunction("entries", self._object_entries),
            "assign": NativeFunction("assign", self._object_assign),
            "freeze": NativeFunction("freeze", lambda a: _arg(a, 0)),
            "fromEntries": NativeFunction(
                "fromEntries",
                lambda a: {to_string(p[0]): p[1] for p in _arg(a, 0, [])}),
        }
        g["JSON"] = {
            "parse": NativeFunction("parse", self._json_parse),
            "stringify": NativeFunction("stringify", self._json_stringify),
        }
        g["Math"] = self._math_object()
        g["Array"] = {
            "isArray": NativeFunction(
                "isArray", lambda a: isinstance(_arg(a, 0), list)),
            "from": NativeFunction("from", self._array_from),
        }
        g["Number"] = NativeFunction("Number", lambda a: to_number(
            _arg(a, 0, 0)))
        g["String"] = NativeFunction("String", lambda a: to_string(
            _arg(a, 0, "")))
        g["Boolean"] = NativeFunction("Boolean", lambda a: truthy(
            _arg(a, 0)))
        g["parseInt"] = NativeFunction("parseInt", self._parse_int)
        g["parseFloat"] = NativeFunction("parseFloat", self._parse_float)
        g["isNaN"] = NativeFunction("isNaN", lambda a: (
            lambda n: isinstance(n, float) and n != n)(
                to_number(_arg(a, 0))))
        g["NaN"] = math.nan
        g["Infinity"] = math.inf
        g["undefined"] = UNDEFINED
        g["globalThis"] = g
        for name in ("Error", "TypeError", "RangeError", "SyntaxError"):
            g[name] = NativeFunction(
                name, (lambda n: lambda a: {
                    "__is_error__": True, "name": n,
                    "message": to_string(_arg(a, 0, "")),
                })(name))
        g["console"] = {
            level: NativeFunction(level, self._console(level))
            for level in ("log", "info", "warn", "error", "debug")
        }
        for name, obj in (host or {}).items():
            g[name] = obj

    # -- globals ------------------------------------------------------

    def _console(self, level):
        def fn(args):
            line = " ".join(to_string(a) for a in args)
            if self.logger is not None:
                self.logger(level, line)
            return UNDEFINED
        return fn

    @staticmethod
    def _object_keys(args):
        o = _arg(args, 0)
        if isinstance(o, dict):
            return [k for k in o if k != "__is_error__"]
        if isinstance(o, list):
            return [str(i) for i in range(len(o))]
        if isinstance(o, str):
            return [str(i) for i in range(len(o))]
        return []

    @staticmethod
    def _object_values(args):
        o = _arg(args, 0)
        if isinstance(o, dict):
            return [v for k, v in o.items() if k != "__is_error__"]
        if isinstance(o, (list, str)):
            return list(o)
        return []

    @staticmethod
    def _object_entries(args):
        o = _arg(args, 0)
        if isinstance(o, dict):
            return [[k, v] for k, v in o.items() if k != "__is_error__"]
        if isinstance(o, (list, str)):
            return [[str(i), v] for i, v in enumerate(o)]
        return []

    @staticmethod
    def _object_assign(args):
        target = _arg(args, 0)
        if not isinstance(target, dict):
            raise JSThrow("TypeError: Object.assign target must be an "
                          "object")
        for src in args[1:]:
            if isinstance(src, dict):
                target.update(src)
        return target

    @staticmethod
    def _json_parse(args):
        try:
            return json.loads(to_string(_arg(args, 0)))
        except Exception as e:
            raise JSThrow(f"SyntaxError: JSON.parse: {e}")

    @staticmethod
    def _json_stringify(args):
        indent = _arg(args, 2, None)
        if isinstance(indent, (int, float)) and not isinstance(
                indent, bool) and indent:
            return js_json_stringify(_arg(args, 0), indent=int(indent))
        return js_json_stringify(_arg(args, 0))

    @staticmethod
    def _math_object():
        fns = {
            "floor": lambda a: math.floor(to_number(_arg(a, 0))),
            "ceil": lambda a: math.ceil(to_number(_arg(a, 0))),
            "round": lambda a: math.floor(to_number(_arg(a, 0)) + 0.5),
            "trunc": lambda a: math.trunc(to_number(_arg(a, 0))),
            "abs": lambda a: _norm_num(abs(to_number(_arg(a, 0)))),
            "sign": lambda a: (lambda n: 0 if n == 0 else
                               (1 if n > 0 else -1))(to_number(_arg(a, 0))),
            "sqrt": lambda a: _norm_num(math.sqrt(to_number(_arg(a, 0)))),
            "pow": lambda a: _norm_num(
                to_number(_arg(a, 0)) ** to_number(_arg(a, 1))),
            "min": lambda a: _norm_num(min(
                (to_number(x) for x in a), default=math.inf)),
            "max": lambda a: _norm_num(max(
                (to_number(x) for x in a), default=-math.inf)),
            "log": lambda a: _norm_num(math.log(to_number(_arg(a, 0)))),
            "log2": lambda a: _norm_num(math.log2(to_number(_arg(a, 0)))),
            "log10": lambda a: _norm_num(math.log10(to_number(_arg(a, 0)))),
            "exp": lambda a: _norm_num(math.exp(to_number(_arg(a, 0)))),
            "hypot": lambda a: _norm_num(math.hypot(
                *(to_number(x) for x in a))),
        }
        obj = {k: NativeFunction(k, fn) for k, fn in fns.items()}
        obj["PI"] = math.pi
        obj["E"] = math.e
        return obj

    @staticmethod
    def _array_from(args):
        src = _arg(args, 0)
        if isinstance(src, (list, str)):
            return list(src)
        if isinstance(src, dict):
            n = src.get("length", 0)
            return [src.get(str(i), UNDEFINED) for i in range(int(
                to_number(n)))]
        return []

    @staticmethod
    def _parse_int(args):
        s = to_string(_arg(args, 0)).strip()
        radix = _int_arg(args, 1, 0)
        sign = 1
        if s[:1] in "+-":
            sign = -1 if s[0] == "-" else 1
            s = s[1:]
        # ES parseInt: with no/zero radix a 0x prefix selects base 16
        if radix in (0, 16) and s[:2].lower() == "0x":
            s = s[2:]
            radix = 16
        if radix == 0:
            radix = 10
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:radix]
        out = 0
        seen = False
        for c in s.lower():
            if c not in digits:
                break
            out = out * radix + digits.index(c)
            seen = True
        return sign * out if seen else math.nan

    @staticmethod
    def _parse_float(args):
        s = to_string(_arg(args, 0)).strip()
        import re as _re

        m = _re.match(r"[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", s)
        return _norm_num(float(m.group())) if m else math.nan

    # -- execution ------------------------------------------------------

    def run(self, program, scope=None):
        """Execute a parsed program; returns the last expression value
        (goja RunProgram returns the completion value)."""
        scope = scope or Scope(self.globals, is_function=True)
        return self.exec_block(program, scope)

    def exec_block(self, block, scope):
        last = UNDEFINED
        stmts = block[1]
        for s in stmts:                      # function-decl hoisting
            if s[0] == "funcdecl":
                scope.declare(s[1], JSFunction(s[1], s[2], s[3], scope,
                                               False), "var")
        for s in stmts:
            last = self.exec_stmt(s, scope)
        return last

    def exec_stmt(self, node, scope):
        op = node[0]
        if op == "expr":
            return self.eval(node[1], scope)
        if op == "vardecl":
            _, kind, decls = node
            for name, init in decls:
                value = UNDEFINED if init is None else self.eval(init,
                                                                 scope)
                scope.declare(name, value, kind)
            return UNDEFINED
        if op == "block":
            return self.exec_block(node, Scope(scope))
        if op == "if":
            _, test, then, other = node
            if truthy(self.eval(test, scope)):
                return self.exec_stmt(then, scope)
            if other is not None:
                return self.exec_stmt(other, scope)
            return UNDEFINED
        if op == "while":
            _, test, body = node
            while truthy(self.eval(test, scope)):
                try:
                    self.exec_stmt(body, scope)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if op == "dowhile":
            _, test, body = node
            while True:
                try:
                    self.exec_stmt(body, scope)
                except _Break:
                    break
                except _Continue:
                    pass
                if not truthy(self.eval(test, scope)):
                    break
            return UNDEFINED
        if op == "for":
            _, init, test, update, body = node
            inner = Scope(scope)
            if init is not None:
                self.exec_stmt(init, inner)
            while test is None or truthy(self.eval(test, inner)):
                try:
                    self.exec_stmt(body, inner)
                except _Break:
                    break
                except _Continue:
                    pass
                if update is not None:
                    self.eval(update, inner)
            return UNDEFINED
        if op in ("forin", "forof"):
            _, target, seq_node, body, declares = node
            seq = self.eval(seq_node, scope)
            if op == "forin":
                if isinstance(seq, dict):
                    items = [k for k in list(seq) if k != "__is_error__"]
                elif isinstance(seq, (list, str)):
                    items = [str(i) for i in range(len(seq))]
                else:
                    items = []
            else:
                if isinstance(seq, (list, str)):
                    items = list(seq)
                elif isinstance(seq, dict):
                    raise JSThrow("TypeError: object is not iterable")
                else:
                    items = []
            for item in items:
                inner = Scope(scope)
                if declares:
                    inner.declare(target, item, "let")
                else:
                    scope.set(target, item)
                try:
                    self.exec_stmt(body, inner)
                except _Break:
                    break
                except _Continue:
                    continue
            return UNDEFINED
        if op == "funcdecl":
            return UNDEFINED                 # hoisted by exec_block
        if op == "return":
            raise _Return(UNDEFINED if node[1] is None
                          else self.eval(node[1], scope))
        if op == "break":
            raise _Break()
        if op == "continue":
            raise _Continue()
        if op == "throw":
            raise JSThrow(self.eval(node[1], scope))
        if op == "try":
            _, block, param, handler, finalizer = node
            try:
                try:
                    return self.exec_block(block, Scope(scope))
                except JSThrow as e:
                    if handler is None:
                        raise
                    inner = Scope(scope)
                    if param is not None:
                        inner.declare(param, e.value, "let")
                    return self.exec_block(handler, inner)
            finally:
                if finalizer is not None:
                    self.exec_block(finalizer, Scope(scope))
        if op == "switch":
            _, disc_node, cases = node
            disc = self.eval(disc_node, scope)
            inner = Scope(scope)
            matched = False
            try:
                for test, body in cases:
                    if not matched and test is not None and \
                            strict_eq(disc, self.eval(test, inner)):
                        matched = True
                    if matched:
                        for s in body:
                            self.exec_stmt(s, inner)
                if not matched:
                    run = False
                    for test, body in cases:
                        if test is None:
                            run = True
                        if run:
                            for s in body:
                                self.exec_stmt(s, inner)
            except _Break:
                pass
            return UNDEFINED
        if op == "empty":
            return UNDEFINED
        raise JSError(f"javascript: unknown statement {op!r}")

    # -- expression evaluation -------------------------------------------

    def eval(self, node, scope):
        op = node[0]
        if op == "lit":
            return node[1]
        if op == "name":
            return scope.get(node[1])
        if op == "this":
            # walk the scope chain: non-arrow calls declare "this" in
            # their function scope; at top level it stays undefined
            s = scope
            while s is not None:
                if "this" in s.vars:
                    return s.vars["this"]
                s = s.parent
            return UNDEFINED
        if op == "template":
            return "".join(to_string(self.eval(p, scope))
                           for p in node[1])
        if op == "array":
            return [self.eval(e, scope) for e in node[1]]
        if op == "object":
            out = {}
            for key_node, val_node in node[1]:
                key = key_node[1] if key_node[0] == "lit" \
                    else to_string(self.eval(key_node, scope))
                out[to_string(key)] = self.eval(val_node, scope)
            return out
        if op == "func":
            _, name, params, body, is_arrow = node
            return JSFunction(name, params, body, scope, is_arrow)
        if op == "seq":
            self.eval(node[1], scope)
            return self.eval(node[2], scope)
        if op == "cond":
            return self.eval(node[2] if truthy(self.eval(node[1], scope))
                             else node[3], scope)
        if op == "logic":
            left = self.eval(node[2], scope)
            if node[1] == "&&":
                return self.eval(node[3], scope) if truthy(left) else left
            return left if truthy(left) else self.eval(node[3], scope)
        if op == "bin":
            return self.binop(node[1], self.eval(node[2], scope),
                              self.eval(node[3], scope))
        if op == "unary":
            return self.unaryop(node[1], node[2], scope)
        if op == "update":
            return self.update(node[1], node[2], node[3], scope)
        if op == "assign":
            return self.assign(node[1], node[2], node[3], scope)
        if op == "member":
            return self.get_member(self.eval(node[1], scope), node[2])
        if op == "index":
            obj = self.eval(node[1], scope)
            key = self.eval(node[2], scope)
            return self.get_index(obj, key)
        if op == "call":
            return self.eval_call(node, scope)
        if op == "new":
            ctor = self.eval(node[1], scope)
            args = [self.eval(a, scope) for a in node[2]]
            if isinstance(ctor, NativeFunction):
                return ctor.fn(args)
            if isinstance(ctor, JSFunction):
                this = {}
                result = self.call_function(ctor, args, this=this)
                return result if isinstance(result, (dict, list)) else this
            raise JSThrow("TypeError: not a constructor")
        raise JSError(f"javascript: unknown expression {op!r}")

    def binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str) or \
                    isinstance(a, (list, dict)) or \
                    isinstance(b, (list, dict)):
                return to_string(a) + to_string(b)
            return _norm_num(to_number(a) + to_number(b))
        if op == "-":
            return _norm_num(to_number(a) - to_number(b))
        if op == "*":
            return _norm_num(to_number(a) * to_number(b))
        if op == "/":
            an, bn = to_number(a), to_number(b)
            if bn == 0:
                if an != an or bn != bn or an == 0:
                    return math.nan
                return math.inf if (an > 0) == (
                    not isinstance(bn, float) or
                    math.copysign(1, bn) > 0) else -math.inf
            return _norm_num(an / bn)
        if op == "%":
            an, bn = to_number(a), to_number(b)
            if bn == 0 or an != an or bn != bn:
                return math.nan
            return _norm_num(math.fmod(an, bn))
        if op == "**":
            return _norm_num(to_number(a) ** to_number(b))
        if op == "===":
            return strict_eq(a, b)
        if op == "!==":
            return not strict_eq(a, b)
        if op == "==":
            return loose_eq(a, b)
        if op == "!=":
            return not loose_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                x, y = a, b
            else:
                x, y = to_number(a), to_number(b)
                if x != x or y != y:
                    return False
            return {"<": x < y, ">": x > y,
                    "<=": x <= y, ">=": x >= y}[op]
        if op == "in":
            key = to_string(a)
            if isinstance(b, dict):
                return key in b
            if isinstance(b, list):
                n = to_number(a)
                return isinstance(n, int) and 0 <= n < len(b)
            raise JSThrow("TypeError: 'in' on non-object")
        if op == "instanceof":
            return False
        if op in ("&", "|", "^", "<<", ">>", ">>>"):
            ai, bi = _to_int32(a), _to_int32(b)
            if op == "&":
                return _from_int32(ai & bi)
            if op == "|":
                return _from_int32(ai | bi)
            if op == "^":
                return _from_int32(ai ^ bi)
            if op == "<<":
                return _from_int32((ai << (bi & 31)) & 0xFFFFFFFF)
            if op == ">>":
                return ai >> (bi & 31)
            return (ai & 0xFFFFFFFF) >> (bi & 31)
        raise JSError(f"javascript: unknown operator {op!r}")

    def unaryop(self, op, target, scope):
        if op == "typeof":
            if target[0] == "name" and not scope.has(target[1]):
                return "undefined"
            return js_typeof(self.eval(target, scope))
        if op == "delete":
            if target[0] == "member":
                obj = self.eval(target[1], scope)
                key = target[2]
            elif target[0] == "index":
                obj = self.eval(target[1], scope)
                key = to_string(self.eval(target[2], scope))
            else:
                return True
            if isinstance(obj, dict):
                obj.pop(key, None)
                return True
            if isinstance(obj, list):
                try:
                    i = int(to_number(key))
                    if 0 <= i < len(obj):
                        obj[i] = UNDEFINED
                except (ValueError, OverflowError):
                    pass
                return True
            return True
        value = self.eval(target, scope)
        if op == "void":
            return UNDEFINED
        if op == "!":
            return not truthy(value)
        if op == "-":
            return _norm_num(-to_number(value))
        if op == "+":
            return to_number(value)
        if op == "~":
            return _from_int32(~_to_int32(value))
        raise JSError(f"javascript: unknown unary {op!r}")

    def update(self, op, target, prefix, scope):
        old = to_number(self.eval(target, scope))
        new = _norm_num(old + (1 if op == "++" else -1))
        self.store(target, new, scope)
        return new if prefix else _norm_num(old)

    def assign(self, op, target, value_node, scope):
        if op == "=":
            value = self.eval(value_node, scope)
        else:
            value = self.binop(op[:-1], self.eval(target, scope),
                               self.eval(value_node, scope))
        self.store(target, value, scope)
        return value

    def store(self, target, value, scope):
        kind = target[0]
        if kind == "name":
            scope.set(target[1], value)
        elif kind == "member":
            self.set_member(self.eval(target[1], scope), target[2], value)
        elif kind == "index":
            obj = self.eval(target[1], scope)
            key = self.eval(target[2], scope)
            if isinstance(obj, list):
                i = int(to_number(key))
                while len(obj) <= i:
                    obj.append(UNDEFINED)
                obj[i] = value
            else:
                self.set_member(obj, to_string(key), value)
        else:
            raise JSThrow("TypeError: invalid assignment target")

    @staticmethod
    def set_member(obj, key, value):
        if isinstance(obj, dict):
            obj[key] = value
        elif isinstance(obj, list) and key == "length":
            n = int(to_number(value))
            del obj[n:]
            while len(obj) < n:
                obj.append(UNDEFINED)
        elif obj is None or obj is UNDEFINED:
            raise JSThrow(
                f"TypeError: cannot set property {key!r} of "
                f"{to_string(obj)}")
        # silently ignore sets on primitives (JS sloppy mode)

    def get_index(self, obj, key):
        if isinstance(obj, (list, str)) and isinstance(
                key, (int, float)) and not isinstance(key, bool):
            i = int(key)
            if 0 <= i < len(obj):
                return obj[i]
            return UNDEFINED
        return self.get_member(obj, to_string(key))

    def get_member(self, obj, key):
        if obj is None or obj is UNDEFINED:
            raise JSThrow(
                f"TypeError: cannot read property {key!r} of "
                f"{to_string(obj)}")
        if isinstance(obj, dict):
            if key in obj:
                return obj[key]
            if key == "hasOwnProperty":
                return _Bound(obj, lambda o, a: to_string(
                    _arg(a, 0)) in o)
            if key == "toString":
                return _Bound(obj, lambda o, a: to_string(o))
            return UNDEFINED
        if isinstance(obj, list):
            if key == "length":
                return len(obj)
            if key.lstrip("-").isdigit():
                i = int(key)
                return obj[i] if 0 <= i < len(obj) else UNDEFINED
            fn = _ARRAY_METHODS.get(key)
            if fn is not None:
                return _Bound(obj, fn)
            return UNDEFINED
        if isinstance(obj, str):
            if key == "length":
                return len(obj)
            if key.isdigit():
                i = int(key)
                return obj[i] if i < len(obj) else UNDEFINED
            fn = _STRING_METHODS.get(key)
            if fn is not None:
                return _Bound(obj, fn)
            return UNDEFINED
        if isinstance(obj, bool):
            if key == "toString":
                return _Bound(obj, lambda o, a: to_string(o))
            return UNDEFINED
        if isinstance(obj, (int, float)):
            fn = _NUMBER_METHODS.get(key)
            if fn is not None:
                return _Bound(obj, fn)
            return UNDEFINED
        if isinstance(obj, (JSFunction, NativeFunction)):
            if key == "name":
                return getattr(obj, "name", "")
            if key == "call":
                return _Bound(obj, lambda f, a: self.call_value(
                    f, list(a[1:]), this=_arg(a, 0)))
            if key == "apply":
                return _Bound(obj, lambda f, a: self.call_value(
                    f, list(_arg(a, 1, [])), this=_arg(a, 0)))
            return UNDEFINED
        return UNDEFINED

    def eval_call(self, node, scope):
        _, callee, arg_nodes = node
        args = [self.eval(a, scope) for a in arg_nodes]
        if callee[0] == "member":
            obj = self.eval(callee[1], scope)
            fn = self.get_member(obj, callee[2])
            if fn is UNDEFINED:
                raise JSThrow(
                    f"TypeError: {to_string(obj) if not isinstance(obj, dict) else 'object'}"
                    f".{callee[2]} is not a function")
            return self.call_value(fn, args, this=obj)
        if callee[0] == "index":
            obj = self.eval(callee[1], scope)
            fn = self.get_index(obj, self.eval(callee[2], scope))
            return self.call_value(fn, args, this=obj)
        fn = self.eval(callee, scope)
        return self.call_value(fn, args)

    def call_value(self, fn, args, this=UNDEFINED):
        if isinstance(fn, _Bound):
            return fn.fn(fn.obj, args)
        if isinstance(fn, NativeFunction):
            return fn.fn(args)
        if isinstance(fn, JSFunction):
            return self.call_function(fn, args, this=this)
        raise JSThrow(f"TypeError: {to_string(fn)} is not a function")

    def call_function(self, fn: JSFunction, args, this=UNDEFINED):
        scope = Scope(fn.scope, is_function=True)
        for i, p in enumerate(fn.params):
            scope.declare(p, args[i] if i < len(args) else UNDEFINED,
                          "let")
        if not fn.is_arrow:
            scope.declare("arguments", list(args), "let")
            # bind `this` for ordinary functions (method calls pass
            # the receiver, `new` passes the fresh object); arrows
            # skip the binding so lexical lookup finds the enclosing
            # function's `this` — goja/ES semantics
            scope.declare("this", this, "let")
        try:
            self.exec_block(fn.body, scope)
        except _Return as r:
            return r.value
        return UNDEFINED


def _to_int32(v):
    n = to_number(v)
    if isinstance(n, float):
        if n != n or math.isinf(n):
            return 0
        n = int(n)
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _from_int32(n):
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


# ---------------------------------------------------------------------------
# Array / string / number method tables (obj, args) -> value
# ---------------------------------------------------------------------------


def _interp_cb(fn):
    """Most callbacks close over an Interp; method tables are static,
    so call through a module-level trampoline that only needs the
    function value itself."""
    _i = Interp.__new__(Interp)            # bare caller, no globals

    def call(cb, args):
        if isinstance(cb, _Bound):
            return cb.fn(cb.obj, args)
        if isinstance(cb, NativeFunction):
            return cb.fn(args)
        if isinstance(cb, JSFunction):
            return _i.call_function(cb, args)
        raise JSThrow("TypeError: callback is not a function")

    return call(fn[0], fn[1])


def _call_cb(cb, args):
    return _interp_cb((cb, args))


_ARRAY_METHODS = {
    "push": lambda o, a: (o.extend(a), len(o))[1],
    "pop": lambda o, a: o.pop() if o else UNDEFINED,
    "shift": lambda o, a: o.pop(0) if o else UNDEFINED,
    "unshift": lambda o, a: (o.__setitem__(slice(0, 0), list(a)),
                             len(o))[1],
    "slice": lambda o, a: o[_slice_idx(len(o), _arg(a, 0, 0), 0):
                            _slice_idx(len(o), _arg(a, 1), len(o))],
    "splice": lambda o, a: _splice(o, a),
    "indexOf": lambda o, a: next(
        (i for i, x in enumerate(o) if strict_eq(x, _arg(a, 0))), -1),
    "lastIndexOf": lambda o, a: next(
        (i for i in range(len(o) - 1, -1, -1)
         if strict_eq(o[i], _arg(a, 0))), -1),
    "includes": lambda o, a: any(strict_eq(x, _arg(a, 0)) for x in o),
    "join": lambda o, a: to_string(
        _arg(a, 0, ",") if _arg(a, 0, ",") is not UNDEFINED
        else ",").join(
        "" if x is None or x is UNDEFINED else to_string(x) for x in o),
    "map": lambda o, a: [_call_cb(_arg(a, 0), [x, i, o])
                         for i, x in enumerate(o)],
    "filter": lambda o, a: [x for i, x in enumerate(o)
                            if truthy(_call_cb(_arg(a, 0), [x, i, o]))],
    "forEach": lambda o, a: ([_call_cb(_arg(a, 0), [x, i, o])
                              for i, x in enumerate(o)], UNDEFINED)[1],
    "reduce": lambda o, a: _reduce(o, a),
    "concat": lambda o, a: sum(
        (x if isinstance(x, list) else [x] for x in a), list(o)),
    "reverse": lambda o, a: (o.reverse(), o)[1],
    "sort": lambda o, a: _sort(o, a),
    "find": lambda o, a: next(
        (x for i, x in enumerate(o)
         if truthy(_call_cb(_arg(a, 0), [x, i, o]))), UNDEFINED),
    "findIndex": lambda o, a: next(
        (i for i, x in enumerate(o)
         if truthy(_call_cb(_arg(a, 0), [x, i, o]))), -1),
    "some": lambda o, a: any(
        truthy(_call_cb(_arg(a, 0), [x, i, o]))
        for i, x in enumerate(o)),
    "every": lambda o, a: all(
        truthy(_call_cb(_arg(a, 0), [x, i, o]))
        for i, x in enumerate(o)),
    "flat": lambda o, a: _flat(o, _int_arg(a, 0, 1)),
    "fill": lambda o, a: (o.__setitem__(
        slice(_slice_idx(len(o), _arg(a, 1, 0), 0),
              _slice_idx(len(o), _arg(a, 2), len(o))),
        [_arg(a, 0)] * (_slice_idx(len(o), _arg(a, 2), len(o)) -
                        _slice_idx(len(o), _arg(a, 1, 0), 0))), o)[1],
    "toString": lambda o, a: to_string(o),
}


def _splice(o, a):
    start = _slice_idx(len(o), _arg(a, 0, 0), 0)
    count = len(o) - start if len(a) < 2 else max(
        0, min(_int_arg(a, 1, 0), len(o) - start))
    removed = o[start:start + count]
    o[start:start + count] = list(a[2:])
    return removed


def _reduce(o, a):
    cb = _arg(a, 0)
    items = list(enumerate(o))
    if len(a) >= 2:
        acc = a[1]
    else:
        if not items:
            raise JSThrow("TypeError: reduce of empty array with no "
                          "initial value")
        acc = items[0][1]
        items = items[1:]
    for i, x in items:
        acc = _call_cb(cb, [acc, x, i, o])
    return acc


def _sort(o, a):
    import functools

    cb = _arg(a, 0)
    if cb is UNDEFINED:
        o.sort(key=to_string)
    else:
        def cmp(x, y):
            r = to_number(_call_cb(cb, [x, y]))
            return -1 if r < 0 else (1 if r > 0 else 0)

        o.sort(key=functools.cmp_to_key(cmp))
    return o


def _flat(o, depth):
    out = []
    for x in o:
        if isinstance(x, list) and depth > 0:
            out.extend(_flat(x, depth - 1))
        else:
            out.append(x)
    return out


_STRING_METHODS = {
    "charAt": lambda o, a: o[_int_arg(a, 0, 0)]
    if 0 <= _int_arg(a, 0, 0) < len(o) else "",
    "charCodeAt": lambda o, a: ord(o[_int_arg(a, 0, 0)])
    if 0 <= _int_arg(a, 0, 0) < len(o) else math.nan,
    "codePointAt": lambda o, a: ord(o[_int_arg(a, 0, 0)])
    if 0 <= _int_arg(a, 0, 0) < len(o) else UNDEFINED,
    "indexOf": lambda o, a: o.find(to_string(_arg(a, 0))),
    "lastIndexOf": lambda o, a: o.rfind(to_string(_arg(a, 0))),
    "includes": lambda o, a: to_string(_arg(a, 0)) in o,
    "startsWith": lambda o, a: o.startswith(to_string(_arg(a, 0))),
    "endsWith": lambda o, a: o.endswith(to_string(_arg(a, 0))),
    "slice": lambda o, a: o[_slice_idx(len(o), _arg(a, 0, 0), 0):
                            _slice_idx(len(o), _arg(a, 1), len(o))],
    "substring": lambda o, a: _substring(o, a),
    "substr": lambda o, a: o[_slice_idx(len(o), _arg(a, 0, 0), 0):][
        :None if _arg(a, 1) is UNDEFINED else max(0, _int_arg(a, 1, 0))],
    "toUpperCase": lambda o, a: o.upper(),
    "toLowerCase": lambda o, a: o.lower(),
    "trim": lambda o, a: o.strip(),
    "trimStart": lambda o, a: o.lstrip(),
    "trimEnd": lambda o, a: o.rstrip(),
    "split": lambda o, a: _split(o, a),
    "replace": lambda o, a: o.replace(
        to_string(_arg(a, 0)), to_string(_arg(a, 1)), 1),
    "replaceAll": lambda o, a: o.replace(
        to_string(_arg(a, 0)), to_string(_arg(a, 1))),
    "repeat": lambda o, a: o * _int_arg(a, 0, 0),
    "padStart": lambda o, a: _pad(o, a, True),
    "padEnd": lambda o, a: _pad(o, a, False),
    "concat": lambda o, a: o + "".join(to_string(x) for x in a),
    "toString": lambda o, a: o,
    "valueOf": lambda o, a: o,
}


def _substring(o, a):
    i = _slice_idx(len(o), _arg(a, 0, 0), 0)
    j = _slice_idx(len(o), _arg(a, 1), len(o))
    if i > j:
        i, j = j, i
    return o[i:j]


def _split(o, a):
    sep = _arg(a, 0)
    if sep is UNDEFINED:
        return [o]
    sep = to_string(sep)
    if sep == "":
        return list(o)
    return o.split(sep)


def _pad(o, a, start):
    n = _int_arg(a, 0, 0)
    fill = to_string(_arg(a, 1, " ")) or " "
    if len(o) >= n:
        return o
    pad = (fill * n)[:n - len(o)]
    return pad + o if start else o + pad


_NUMBER_METHODS = {
    "toString": lambda o, a: _num_to_string(o, a),
    "toFixed": lambda o, a: f"{float(o):.{_int_arg(a, 0, 0)}f}",
    "valueOf": lambda o, a: o,
}


def _num_to_string(o, a):
    radix = _int_arg(a, 0, 10)
    if radix == 10:
        return _num_str(o)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    n = int(o)
    if n == 0:
        return "0"
    sign = "-" if n < 0 else ""
    n = abs(n)
    out = []
    while n:
        out.append(digits[n % radix])
        n //= radix
    return sign + "".join(reversed(out))


def compile_js(src: str):
    """Parse a program once (≈ goja.Compile); run it many times."""
    return _Parser(src).parse_program()
