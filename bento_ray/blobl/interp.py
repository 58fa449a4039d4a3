"""Bloblang interpreter: executes a parsed mapping against one message.

Execution semantics mirror the reference's mapping executor
(internal/bloblang/mapping/executor.go:115-207) and query layer:

- ``root`` starts as NOTHING; if it is still NOTHING at the end, the
  original message content is kept unchanged; DELETE drops the message;
  a string/bytes root becomes raw content; anything else is structured.
- Assigning NOTHING is skipped entirely (statement.go:50-53); assigning
  DELETE to a path deletes it (assignment.go:181-184); assigning to a
  path of a NOTHING/null root creates a fresh object (:176-178).
- Field access through missing paths yields null (gabs semantics,
  functions.go:77), errors come from type coercion.
- ``&&``/``||`` short-circuit and require bool (arithmetic.go:396-440);
  ``|`` coalesces error-or-null (:442-451); ``/`` is float division,
  ``%`` integer (:176-206); ``+`` adds numbers or concatenates strings
  (:211-246).
- match: case queries must yield bool to match; literal cases compare
  with ICompare; no match → NOTHING (expression.go:37-52).
- if: null condition is honorary false; no else → NOTHING
  (expression.go:95-135).
- Lambdas (``v -> ...``) capture the piped value under a name and
  restore the outer ``this`` (NamedContextFunction, expression.go).
"""

from __future__ import annotations

import json
import os

from bento_ray.blobl import methods as M
from bento_ray.blobl import functions as F
from bento_ray.blobl.parser import parse_mapping
from bento_ray.blobl.values import (
    DELETE, NOTHING, BloblangError, clone, get_bool, get_int, get_number,
    get_string, go_json_dumps, icompare, is_null,
)


class Context:
    """Evaluation context for one statement execution."""

    __slots__ = ("stack", "named", "vars", "meta", "root_ref", "index",
                 "batch", "maps", "env", "counters", "legacy")

    def __init__(self, stack, named, vars, meta, root_ref, index, batch,
                 maps, env, counters, legacy=None):
        self.stack = stack          # tuple of context values; top = this
        self.named = named          # lambda-captured contexts
        self.vars = vars
        self.meta = meta            # metadata dict of the NEW message
        self.root_ref = root_ref    # 1-element list holding root value
        self.index = index
        self.batch = batch          # list of lazy message accessors
        self.maps = maps            # named map definitions
        self.env = env
        self.counters = counters
        self.legacy = legacy or {}  # input content/metadata accessors

    def this(self):
        if not self.stack:
            raise BloblangError("unable to reference message as structured "
                                "(no context)")
        return self.stack[-1]

    def with_value(self, v) -> "Context":
        c = self._copy()
        c.stack = self.stack + (v,)
        return c

    def with_named(self, name, v) -> "Context":
        """Capture ``v`` under ``name`` while leaving ``this`` intact —
        the reference's NamedContextFunction pops the element map_each
        PUSHED, so the mapping's own context keeps resolving inside
        lambdas (expression.go:164-173)."""
        c = self._copy()
        c.named = {**self.named, name: v}
        return c

    def _copy(self) -> "Context":
        return Context(self.stack, self.named, self.vars, self.meta,
                       self.root_ref, self.index, self.batch, self.maps,
                       self.env, self.counters, self.legacy)


def walk_path(target, segs):
    """gabs .S(...) semantics: missing → None, never an error."""
    cur = target
    for s in segs:
        if isinstance(cur, dict):
            cur = cur.get(str(s))
        elif isinstance(cur, list):
            try:
                cur = cur[int(s)]
            except (ValueError, TypeError, IndexError):
                return None
        else:
            return None
    return cur


def _list_index(s, container) -> int:
    try:
        return int(s)
    except (ValueError, TypeError):
        raise BloblangError(
            f"unable to set target path: field {s!r} cannot index an "
            f"array of {len(container)} elements")


def set_path(container, segs, val):
    """gabs .Set semantics: create intermediate objects along the path."""
    cur = container
    for i, s in enumerate(segs[:-1]):
        key = str(s)
        if isinstance(cur, list):
            if key == "-":  # gabs JSON-pointer append
                cur.append({})
                cur = cur[-1]
                continue
            idx = _list_index(s, cur)
            while len(cur) <= idx:
                cur.append(None)
            if not isinstance(cur[idx], (dict, list)):
                cur[idx] = {}
            cur = cur[idx]
            continue
        nxt = cur.get(key) if isinstance(cur, dict) else None
        if not isinstance(nxt, (dict, list)):
            nxt = {}
            cur[key] = nxt
        cur = nxt
    last = segs[-1]
    if isinstance(cur, list):
        if str(last) == "-":  # gabs JSON-pointer append
            cur.append(val)
            return
        idx = _list_index(last, cur)
        while len(cur) <= idx:
            cur.append(None)
        cur[idx] = val
    else:
        cur[str(last)] = val


def delete_path(container, segs):
    cur = container
    for s in segs[:-1]:
        if isinstance(cur, dict):
            cur = cur.get(str(s))
        elif isinstance(cur, list):
            try:
                cur = cur[int(s)]
            except Exception:
                return
        else:
            return
    if isinstance(cur, dict):
        cur.pop(str(segs[-1]), None)
    elif isinstance(cur, list):
        try:
            del cur[int(segs[-1])]
        except Exception:
            pass


# ---------------------------------------------------------------- evaluator

def eval_query(node, ctx: Context):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "context":
        base, segs = node[1], node[2]
        if base == "this":
            target = ctx.this()
        elif base == "root":
            target = ctx.root_ref[0]
            if target is NOTHING:
                target = None
        elif isinstance(base, tuple) and base[0] == "var":
            if base[1] not in ctx.vars:
                raise BloblangError(
                    f"variable {base[1]} undefined")
            target = ctx.vars[base[1]]
        elif isinstance(base, tuple) and base[0] == "named":
            if base[1] not in ctx.named:
                raise BloblangError(f"named context {base[1]} was not found")
            target = ctx.named[base[1]]
        else:  # pragma: no cover
            raise BloblangError(f"bad context base {base}")
        return walk_path(target, segs) if segs else target
    if kind == "getpath":
        target = eval_query(node[1], ctx)
        return walk_path(target, node[2])
    if kind == "meta":
        if node[1] is None:
            return dict(ctx.meta)
        return ctx.meta.get(node[1])
    if kind == "arraylit":
        out = []
        for q in node[1]:
            v = eval_query(q, ctx)
            if v is NOTHING or v is DELETE:
                continue
            out.append(v)
        return out
    if kind == "objectlit":
        out = {}
        for kq, vq in node[1]:
            k = get_string(eval_query(kq, ctx))
            v = eval_query(vq, ctx)
            if v is NOTHING or v is DELETE:
                continue
            out[k] = v
        return out
    if kind == "not":
        return not get_bool(eval_query(node[1], ctx))
    if kind == "neg":
        v = eval_query(node[1], ctx)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise BloblangError("cannot negate a non-number")
        return -v
    if kind == "binop":
        return eval_binop(node[1], node[2], node[3], ctx)
    if kind == "if":
        for cond, q in node[1]:
            cv = eval_query(cond, ctx)
            if cv is None or cv is NOTHING:
                cv = False  # honorary false (expression.go:97-104)
            if not isinstance(cv, bool):
                raise BloblangError(
                    f"if condition resolved to a non-boolean value ({cv!r})")
            if cv:
                return eval_query(q, ctx)
        if node[2] is not None:
            return eval_query(node[2], ctx)
        return NOTHING
    if kind == "match":
        operand = ctx.this() if node[1] is None else eval_query(node[1], ctx)
        case_ctx = ctx.with_value(operand)
        for ckind, caseq, resq in node[2]:
            if ckind == "default":
                return eval_query(resq, case_ctx)
            if ckind == "lit":
                if icompare(operand, eval_query(caseq, case_ctx)):
                    return eval_query(resq, case_ctx)
                continue
            cv = eval_query(caseq, case_ctx)
            if cv is True:
                return eval_query(resq, case_ctx)
        return NOTHING
    if kind == "func":
        return F.call_function(node[1], node[2], node[3], ctx, eval_query)
    if kind == "method":
        return M.call_method(node[1], node[2], node[3], node[4], ctx,
                             eval_query)
    if kind == "lambda":
        raise BloblangError("lambda used outside method argument")
    raise BloblangError(f"unknown node kind {kind}")


def eval_binop(op, lq, rq, ctx):
    if op == "&&":
        lv = get_bool(eval_query(lq, ctx))
        if not lv:
            return False
        return get_bool(eval_query(rq, ctx))
    if op == "||":
        lv = get_bool(eval_query(lq, ctx))
        if lv:
            return True
        return get_bool(eval_query(rq, ctx))
    if op == "|":
        try:
            lv = eval_query(lq, ctx)
            if not is_null(lv):
                return lv
        except BloblangError:
            pass
        return eval_query(rq, ctx)

    left = eval_query(lq, ctx)
    right = eval_query(rq, ctx)
    if op == "==":
        return icompare(left, right)
    if op == "!=":
        return not icompare(left, right)
    if op in (">", "<", ">=", "<="):
        return _compare_ord(op, left, right)
    if op == "+":
        if isinstance(left, (str, bytes, bytearray)):
            return get_string(left) + get_string(right)
        return _num_arith(op, left, right)
    if op in ("-", "*"):
        return _num_arith(op, left, right)
    if op == "/":
        ln, rn = get_number(left), get_number(right)
        if rn == 0:
            raise BloblangError("attempted to divide by zero")
        return ln / rn
    if op == "%":
        li, ri = get_int(left), get_int(right)
        if ri == 0:
            raise BloblangError("attempted to divide by zero")
        # Go % truncates toward zero — exact integer arithmetic (a
        # float quotient loses precision past 2^53)
        r = li % ri
        if r != 0 and (li < 0) != (ri < 0):
            r -= ri
        return r
    raise BloblangError(f"unknown operator {op}")


def _num_arith(op, left, right):
    """numberDegradationFunc (arithmetic.go:100-160): float if either is
    float, else int."""
    if isinstance(left, bool) or isinstance(right, bool):
        raise BloblangError(
            f"cannot {op} types bool")
    if not isinstance(left, (int, float)) or not isinstance(right, (int, float)):
        raise BloblangError(
            f"cannot {op} types "
            f"{type(left).__name__} and {type(right).__name__}")
    if isinstance(left, float) or isinstance(right, float):
        a, b = float(left), float(right)
    else:
        a, b = left, right
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    return a * b


def _compare_ord(op, left, right):
    from bento_ray.blobl.values import restrict_for_comparison

    lhs = restrict_for_comparison(left)
    if isinstance(lhs, str):
        rhs = get_string(right)
    elif isinstance(lhs, float) and not isinstance(lhs, bool):
        rhs = get_number(right)
    else:
        raise BloblangError(
            f"cannot compare type {type(left).__name__} with "
            f"{type(right).__name__}")
    if op == ">":
        return lhs > rhs
    if op == "<":
        return lhs < rhs
    if op == ">=":
        return lhs >= rhs
    return lhs <= rhs


# ----------------------------------------------------------------- executor

class Message:
    """One message of a batch: raw bytes + lazily parsed structured
    value + metadata."""

    __slots__ = ("raw", "_structured", "_parsed", "meta", "error")

    def __init__(self, raw=None, structured=None, meta=None, error=None,
                 structured_set: bool | None = None):
        self.raw = raw
        self._structured = structured
        # structured null is representable: pass structured_set=True
        # (the reference's SetStructuredMut(nil) → content "null")
        self._parsed = structured is not None if structured_set is None \
            else structured_set
        self.meta = dict(meta or {})
        self.error = error

    @classmethod
    def from_content(cls, content, meta=None):
        if content is None:
            return cls(structured=None, meta=meta, structured_set=True)
        if isinstance(content, (dict, list, int, float, bool)):
            return cls(structured=content, meta=meta)
        return cls(raw=content, meta=meta)

    def structured(self):
        if not self._parsed:
            if self.raw is None:
                raise BloblangError("message is empty")
            try:
                self._structured = json.loads(
                    self.raw if isinstance(self.raw, str)
                    else self.raw.decode("utf-8"))
            except Exception as e:
                raise BloblangError(f"parse as json: {e}")
            self._parsed = True
        return self._structured

    def content_bytes(self) -> bytes:
        if self.raw is not None:
            return self.raw.encode() if isinstance(self.raw, str) \
                else bytes(self.raw)
        return go_json_dumps(self._structured).encode()


class Mapping:
    """A compiled Bloblang mapping, executable per message or per batch.

    ``is_mutation`` replicates the ``mutation`` processor: root starts
    as the input document instead of NOTHING."""

    def __init__(self, src: str, is_mutation: bool = False):
        self.src = src
        stmts = parse_mapping(src)
        self.maps: dict[str, list] = {}
        self.statements: list = []
        for s in stmts:
            if s[0] == "mapdef":
                self.maps[s[1]] = s[2]
            else:
                self.statements.append(s)
        self.is_mutation = is_mutation

    # -- public API --------------------------------------------------------
    def run_batch(self, messages: list[Message], env: dict | None = None,
                  on_error: str = "raise",
                  counters: dict | None = None) -> list[Message]:
        """Execute against a whole batch (batch_index/from_all context).
        Returns surviving messages (deleted ones dropped).

        ``on_error``: "raise" propagates the first failure; "mark"
        replicates the processor contract — the failed message passes
        through unchanged with its error flag set (read by
        ``error()`` / ``errored()`` downstream).

        ``counters`` backs the ``count()`` function — pass a
        process-lifetime dict (the reference's counters are global) to
        share counts across batches."""
        env = os.environ if env is None else env
        if counters is None:
            counters = {}
        out = []
        for i in range(len(messages)):
            try:
                res = self._map_part(i, messages, env, counters)
            except BloblangError as e:
                if on_error != "mark":
                    raise
                m = messages[i]
                res = Message(raw=m.raw, structured=m._structured,
                              meta=dict(m.meta), error=str(e))
                res._parsed = m._parsed
            if res is not None:
                out.append(res)
        return out

    def run_value(self, value, env: dict | None = None, meta=None):
        """Convenience: run on one structured value, return the mapped
        structured value (or DELETE / raw string)."""
        msg = Message.from_content(value, meta=meta)
        res = self.run_batch([msg], env=env)
        if not res:
            return DELETE
        m = res[0]
        if m._parsed:
            return m._structured
        return m.raw

    # -- internals ---------------------------------------------------------
    def _map_part(self, index: int, batch: list[Message], env,
                  counters) -> Message | None:
        msg = batch[index]
        root_ref = [NOTHING if not self.is_mutation else clone(
            msg.structured())]
        new_meta = dict(msg.meta)
        vars: dict = {}

        def lazy_this():
            return msg.structured()

        ctx = Context(stack=(_LazyThis(lazy_this),), named={}, vars=vars,
                      meta=new_meta, root_ref=root_ref, index=index,
                      batch=batch, maps=self.maps, env=env,
                      counters=counters, legacy={"error": msg.error})
        exec_statements(self.statements, ctx)

        rv = root_ref[0]
        if rv is DELETE:
            return None
        if rv is NOTHING:
            out = Message(raw=msg.raw, structured=msg._structured,
                          meta=new_meta, error=msg.error,
                          structured_set=msg._parsed)
            return out
        if isinstance(rv, (str, bytes, bytearray)):
            return Message(raw=rv, meta=new_meta, error=msg.error)
        return Message(structured=rv, meta=new_meta, error=msg.error,
                       structured_set=True)



def exec_statements(stmts, ctx: Context):
    for s in stmts:
        if s[0] == "assign":
            try:
                exec_assign(s[1], s[2], ctx)
            except BloblangError as e:
                if str(e).startswith("failed assignment"):
                    raise
                line = s[3] if len(s) > 3 else 0
                raise BloblangError(
                    f"failed assignment (line {line}): {e}") from e
        elif s[0] == "ifstmt":
            done = False
            for cond, block in s[1]:
                cv = eval_query(cond, ctx)
                if cv is None or cv is NOTHING:
                    cv = False
                if not isinstance(cv, bool):
                    raise BloblangError(
                        "if condition resolved to a non-boolean value")
                if cv:
                    exec_statements(block, ctx)
                    done = True
                    break
            if not done and s[2] is not None:
                exec_statements(s[2], ctx)
        else:  # pragma: no cover
            raise BloblangError(f"unknown statement {s[0]}")


def exec_assign(target, query, ctx: Context):
    val = eval_query(query, ctx)
    if val is NOTHING:
        return  # skip assignment entirely (statement.go:50-53)
    tkind = target[0]
    if tkind == "var":
        ctx.vars[target[1]] = val
        return
    if tkind == "meta":
        key = target[1]
        if val is DELETE:
            if key is None:
                ctx.meta.clear()
            else:
                ctx.meta.pop(key, None)
        elif key is None:
            if not isinstance(val, dict):
                raise BloblangError(
                    "setting root meta requires object value")
            ctx.meta.clear()
            ctx.meta.update({k: v for k, v in val.items()})
        else:
            ctx.meta[key] = val
        return
    # root path
    segs = target[1]
    val = val if val is DELETE else clone(val)
    if not segs:
        ctx.root_ref[0] = val
        return
    if ctx.root_ref[0] is NOTHING or ctx.root_ref[0] is None or \
            ctx.root_ref[0] is DELETE:
        ctx.root_ref[0] = {}
    if not isinstance(ctx.root_ref[0], (dict, list)):
        raise BloblangError(
            "unable to set target path: root is a non-object type "
            f"({type(ctx.root_ref[0]).__name__})")
    if val is DELETE:
        delete_path(ctx.root_ref[0], segs)
    else:
        set_path(ctx.root_ref[0], segs, val)


class _LazyThis:
    """Defers JSON parsing of the input until `this` is actually
    dereferenced (executor.go lazyValue)."""

    __slots__ = ("fn",)

    def __init__(self, fn):
        self.fn = fn


def resolve_lazy(v):
    if isinstance(v, _LazyThis):
        return v.fn()
    return v


# Patch Context.this to resolve lazily without changing call sites.
_orig_this = Context.this


def _lazy_this(self):
    return resolve_lazy(_orig_this(self))


Context.this = _lazy_this


def compile_mapping(src: str, is_mutation: bool = False) -> Mapping:
    return Mapping(src, is_mutation=is_mutation)
