"""Vectorizing compiler: simple Bloblang mappings → Arrow kernels.

A mapping whose statements are all of the shape
``root.<col> = <expr over this.<col> / literals / arithmetic /
comparisons / if-else / whitelisted methods>`` compiles to ONE batch
function built from ``pyarrow.compute`` kernels — no per-row Python.
Anything else (deletions, meta, match, lambdas, nested paths, batch
functions) falls back to the row-wise interpreter, which is exactly
how the reference executes (one message at a time, executor.go:115).

Semantics preserved from the interpreter where they matter:
- ``/`` is float division (arithmetic.go:176-190);
- ``+`` concatenates strings, adds numbers, int stays int;
- ``if`` lowers to ``pc.if_else`` (both branches required);
- method calls dispatch to the columnar registry
  (functions/bloblang.py METHODS) with literal arguments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class NotVectorizable(Exception):
    pass


_CMP = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
        "<": pc.less, ">=": pc.greater_equal, "<=": pc.less_equal}


def _is_str_like(v):
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return pa.types.is_string(v.type) or pa.types.is_large_string(
            v.type) or pa.types.is_binary(v.type)
    return isinstance(v, (str, bytes))


def _add(a, b):
    if _is_str_like(a) or _is_str_like(b):
        if isinstance(a, (pa.Array, pa.ChunkedArray)) or \
                isinstance(b, (pa.Array, pa.ChunkedArray)):
            return pc.binary_join_element_wise(a, b, "")
        return a + b
    return pc.add(a, b) if isinstance(
        a, (pa.Array, pa.ChunkedArray)) or isinstance(
        b, (pa.Array, pa.ChunkedArray)) else a + b


def _div(a, b):
    def cast(x):
        if isinstance(x, (pa.Array, pa.ChunkedArray)):
            return x.cast(pa.float64())
        return float(x)
    b = cast(b)
    # the interpreter ERRORS the message on division by zero; the
    # float kernel would yield inf silently — defer those batches
    if isinstance(b, float):
        if b == 0.0:
            raise NotVectorizable("division by zero")
    elif pc.any(pc.equal(b, 0.0)).as_py():
        raise NotVectorizable("division by zero in batch")
    return pc.divide(cast(a), b)


class Vectorized:
    """Compiled batch function for a vectorizable mapping."""

    def __init__(self, assignments, referenced_cols, passthrough):
        self.assignments = assignments      # [(out_col, expr_fn)]
        self.referenced = referenced_cols
        self.passthrough = passthrough      # mutation keeps input cols

    def __call__(self, t: pa.Table) -> pa.Table:
        for c in self.referenced:
            if c not in t.column_names:
                raise NotVectorizable(f"column {c} absent from batch")
            # nulls take the row-wise path: Arrow's Kleene kernels
            # silently diverge from the interpreter (null == null is
            # true in Bloblang but null in Arrow; arithmetic/string
            # ops on null ERROR the message rather than propagating
            # null). null_count is O(1) — vectorized speed is only
            # claimed for clean batches.
            if t.column(c).null_count:
                raise NotVectorizable(f"column {c} contains nulls")
        out_cols: dict = {}
        for name, fn in self.assignments:
            v = fn(t)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * len(t))
            out_cols[name] = v
        if self.passthrough:
            for name, v in out_cols.items():
                if name in t.column_names:
                    t = t.set_column(t.schema.get_field_index(name),
                                     name, v)
                else:
                    t = t.append_column(name, v)
            return t
        return pa.table(out_cols)


def compile_vectorized(mapping) -> Vectorized:
    """Compile a parsed Mapping; raises NotVectorizable when any
    statement falls outside the supported subset."""
    if mapping.maps:
        raise NotVectorizable("named maps")
    assignments = []
    referenced: set[str] = set()
    for s in mapping.statements:
        if s[0] != "assign":
            raise NotVectorizable(s[0])
        target, query = s[1], s[2]
        if target[0] != "root" or len(target[1]) != 1:
            raise NotVectorizable("non-simple target")
        fn = _compile_expr(query, referenced)
        assignments.append((str(target[1][0]), fn))
    if not assignments:
        raise NotVectorizable("empty mapping")
    return Vectorized(assignments, sorted(referenced),
                      passthrough=mapping.is_mutation)


_VECTOR_METHOD_ARITY = {
    # name → max literal args accepted by the columnar registry
    "uppercase", "lowercase", "capitalize", "trim", "trim_prefix",
    "trim_suffix", "length", "contains", "has_prefix", "has_suffix",
    "index_of", "slice", "replace_all", "re_match", "re_replace_all",
    "abs", "ceil", "floor", "round", "sqrt", "log", "log10",
    "number", "string", "reverse", "split", "slug",
}


def _compile_expr(node, referenced: set):
    kind = node[0]
    if kind == "lit":
        v = node[1]
        return lambda t: v
    if kind == "context":
        base, segs = node[1], node[2]
        if base != "this" or len(segs) != 1:
            raise NotVectorizable("non-column reference")
        col = str(segs[0])
        referenced.add(col)
        return lambda t: t.column(col)
    if kind == "binop":
        op = node[1]
        lf = _compile_expr(node[2], referenced)
        rf = _compile_expr(node[3], referenced)
        if op in _CMP:
            k = _CMP[op]
            return lambda t: k(lf(t), rf(t))
        if op == "+":
            return lambda t: _add(lf(t), rf(t))
        if op == "-":
            return lambda t: pc.subtract(lf(t), rf(t))
        if op == "*":
            return lambda t: pc.multiply(lf(t), rf(t))
        if op == "/":
            return lambda t: _div(lf(t), rf(t))
        if op == "%":
            # null handling, float fmod semantics and scalar folding
            # all differ from Arrow's int kernels — the row-wise
            # interpreter owns modulo
            raise NotVectorizable("% (interpreter handles modulo)")
        if op == "&&":
            return lambda t: pc.and_kleene(lf(t), rf(t))
        if op == "||":
            return lambda t: pc.or_kleene(lf(t), rf(t))
        raise NotVectorizable(f"operator {op}")
    if kind == "not":
        f = _compile_expr(node[1], referenced)
        return lambda t: pc.invert(f(t))
    if kind == "neg":
        f = _compile_expr(node[1], referenced)
        return lambda t: pc.negate(f(t))
    if kind == "if":
        branches, else_q = node[1], node[2]
        if else_q is None:
            raise NotVectorizable("if without else")
        out = _compile_expr(else_q, referenced)
        for cond, then in reversed(branches):
            cf = _compile_expr(cond, referenced)
            tf = _compile_expr(then, referenced)
            prev = out

            def _mk(cf=cf, tf=tf, prev=prev):
                return lambda t: pc.if_else(cf(t), _arr(tf(t), t),
                                            _arr(prev(t), t))
            out = _mk()
        return out
    if kind == "method":
        name = node[2]
        if name not in _VECTOR_METHOD_ARITY:
            raise NotVectorizable(f"method {name}")
        from bento_ray.functions.bloblang import METHODS

        if name not in METHODS:
            raise NotVectorizable(f"method {name} not columnar")
        tf = _compile_expr(node[1], referenced)
        args = []
        for a in node[3]:
            if a[0] != "lit":
                raise NotVectorizable("non-literal method arg")
            args.append(a[1])
        if node[4]:
            raise NotVectorizable("kwargs")
        m = METHODS[name]
        return lambda t: m(_arr(tf(t), t), *args)
    raise NotVectorizable(kind)


def _arr(v, t):
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    return pa.array([v] * len(t))
