"""Bloblang tokenizer.

Syntax per the reference parser package
(internal/bloblang/parser/query_parser.go, mapping_parser.go):
``#`` comments to end-of-line, double-quoted strings with escapes,
triple-quoted raw strings, backtick raw strings, newlines are
statement / match-arm separators (suppressed inside ``()`` and ``[]``
so arguments can span lines, kept inside ``{}`` where match arms are
newline-separated).
"""

from __future__ import annotations


class Token:
    __slots__ = ("kind", "value", "line", "col")

    def __init__(self, kind: str, value, line: int, col: int):
        self.kind = kind
        self.value = value
        self.line = line
        self.col = col

    def __repr__(self):
        return f"Token({self.kind},{self.value!r},l{self.line})"


_TWO_CHAR = {"==", "!=", ">=", "<=", "&&", "||", "=>", "->"}
_ONE_CHAR = set("+-*/%!=<>|.(),[]{}$@:_")

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
            "/": "/", "b": "\b", "f": "\f", "0": "\0", "'": "'"}


class LexError(ValueError):
    pass


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    line, col = 1, 1
    paren_depth = 0  # () and [] nesting — newlines suppressed inside

    def emit(kind, value, ln, cl):
        toks.append(Token(kind, value, ln, cl))

    while i < n:
        c = src[i]
        ln, cl = line, col
        if c == "\n":
            if paren_depth == 0:
                if toks and toks[-1].kind not in ("NEWLINE",):
                    emit("NEWLINE", None, ln, cl)
            i += 1
            line += 1
            col = 1
            continue
        if c in " \t\r":
            i += 1
            col += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == '"':
            if src.startswith('"""', i):
                j = src.find('"""', i + 3)
                if j < 0:
                    raise LexError(f"unterminated triple string at line {ln}")
                raw = src[i + 3:j]
                line += raw.count("\n")
                emit("STRING", raw, ln, cl)
                i = j + 3
                col = 1
                continue
            j = i + 1
            buf = []
            while j < n:
                ch = src[j]
                if ch == "\\":
                    if j + 1 >= n:
                        raise LexError(f"bad escape at line {ln}")
                    nxt = src[j + 1]
                    if nxt == "u":
                        buf.append(chr(int(src[j + 2:j + 6], 16)))
                        j += 6
                    elif nxt == "x":
                        buf.append(chr(int(src[j + 2:j + 4], 16)))
                        j += 4
                    elif nxt in _ESCAPES:
                        buf.append(_ESCAPES[nxt])
                        j += 2
                    else:
                        raise LexError(f"bad escape \\{nxt} at line {ln}")
                elif ch == '"':
                    break
                elif ch == "\n":
                    raise LexError(f"unterminated string at line {ln}")
                else:
                    buf.append(ch)
                    j += 1
            if j >= n:
                raise LexError(f"unterminated string at line {ln}")
            emit("STRING", "".join(buf), ln, cl)
            col += j + 1 - i
            i = j + 1
            continue
        if c == "`":
            j = src.find("`", i + 1)
            if j < 0:
                raise LexError(f"unterminated raw string at line {ln}")
            raw = src[i + 1:j]
            line += raw.count("\n")
            emit("STRING", raw, ln, cl)
            i = j + 1
            col = 1
            continue
        if c.isdigit():
            j = i
            isfloat = False
            while j < n and (src[j].isdigit() or src[j] in "._eExX+-"):
                if src[j] in "eE":
                    if j + 1 < n and src[j + 1] in "+-":
                        isfloat = True
                        j += 2
                        continue
                    if j + 1 < n and src[j + 1].isdigit():
                        isfloat = True
                        j += 1
                        continue
                    break
                if src[j] == ".":
                    # a digit must follow, else it's a method/field dot
                    if j + 1 < n and src[j + 1].isdigit():
                        isfloat = True
                        j += 1
                        continue
                    break
                if src[j] in "+-xX_":
                    break
                j += 1
            text = src[i:j]
            emit("NUMBER", float(text) if isfloat else int(text), ln, cl)
            col += j - i
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            if word == "_" and not (j < n and (src[j].isalnum() or src[j] == "_")):
                emit("UNDERSCORE", "_", ln, cl)
            elif word in ("true", "false"):
                emit("BOOL", word == "true", ln, cl)
            elif word == "null":
                emit("NULL", None, ln, cl)
            else:
                emit("IDENT", word, ln, cl)
            col += j - i
            i = j
            continue
        two = src[i:i + 2]
        if two in _TWO_CHAR:
            emit("OP", two, ln, cl)
            i += 2
            col += 2
            continue
        if c in _ONE_CHAR:
            if c in "([":
                paren_depth += 1
            elif c in ")]":
                paren_depth = max(0, paren_depth - 1)
            emit("OP", c, ln, cl)
            i += 1
            col += 1
            continue
        raise LexError(f"unexpected character {c!r} at line {ln} col {cl}")

    emit("EOF", None, line, col)
    return toks
