"""Interpolated field strings — ``prefix ${! expr } suffix``.

Reference: internal/bloblang/field/ (parser in
parser/field_parser.go). A field is a sequence of literal chunks and
Bloblang query chunks; resolution per message stringifies each query
result (IToString).
"""

from __future__ import annotations

from bento_ray.blobl.parser import parse_query
from bento_ray.blobl.values import BloblangError


class InterpolatedField:
    def __init__(self, template: str):
        self.template = template
        self.parts: list = []  # ("lit", str) | ("q", ast)
        i = 0
        while i < len(template):
            j = template.find("${!", i)
            if j < 0:
                self.parts.append(("lit", template[i:]))
                break
            if j > i:
                self.parts.append(("lit", template[i:j]))
            k = _find_close(template, j + 3)
            self.parts.append(("q", parse_query(template[j + 3:k])))
            i = k + 1

    @property
    def is_static(self) -> bool:
        return all(p[0] == "lit" for p in self.parts)

    def resolve(self, ctx) -> str:
        from bento_ray.blobl.interp import eval_query
        from bento_ray.blobl.methods import _ito_string

        out = []
        for kind, payload in self.parts:
            if kind == "lit":
                out.append(payload)
            else:
                out.append(_ito_string(eval_query(payload, ctx)))
        return "".join(out)

    def resolve_message(self, index: int, batch, env, counters=None) -> str:
        from bento_ray.blobl.interp import Context, _LazyThis
        from bento_ray.blobl.values import NOTHING

        msg = batch[index]
        ctx = Context(stack=(_LazyThis(msg.structured),), named={},
                      vars={}, meta=dict(msg.meta), root_ref=[NOTHING],
                      index=index, batch=batch, maps={}, env=env,
                      counters=counters if counters is not None else {},
                      legacy={"error": msg.error})
        return self.resolve(ctx)


def _find_close(s: str, start: int) -> int:
    depth = 1
    i = start
    while i < len(s):
        c = s[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i
        elif c == '"':
            i += 1
            while i < len(s) and s[i] != '"':
                i += 2 if s[i] == "\\" else 1
        i += 1
    raise BloblangError(f"unterminated interpolation in {s!r}")
