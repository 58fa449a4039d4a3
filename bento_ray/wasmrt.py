"""Pure-Python WebAssembly runtime for the ``wasm`` processor.

The reference executes a user-supplied WASM module per message via the
wazero JIT (internal/impl/wasm/processor_wazero.go:104-141), exposing a
``bento_wasm`` host module (functions.go:22-110) plus WASI preview1.
This sandbox has no wasm runtime, so the interpreter is built from
scratch against the public WebAssembly core specification (W3C, release
2.0 draft): binary module decoding, validation-light structured control
flow, the full MVP numeric/memory/control instruction set, plus the
post-MVP extensions TinyGo / Rust toolchains emit by default —
sign-extension operators, non-trapping float-to-int saturating
truncations, bulk memory (memory.copy/fill/init, data.drop) and
reference types (ref.null/is_null/func, call_indirect over funcref
tables).

Design: each function body is pre-decoded ONCE into a flat list of
``(opcode, immediate)`` tuples with branch targets resolved to
instruction indices (the classic side-table approach), so the hot loop
never re-parses LEB128. Values are Python ints in unsigned canonical
form (i32 in [0, 2^32), i64 in [0, 2^64)) and Python floats; f32
results round through ``struct.pack('<f', …)`` to keep single-precision
semantics bit-honest. Traps raise :class:`WasmTrap` exactly where the
spec traps (OOB access, div/rem by zero, signed-overflow division,
invalid conversions, unreachable, indirect-call type mismatch).

This is an interpreter, not a JIT: throughput is O(1M instrs/sec),
fine for per-message transforms in the config pipeline surface; bulk
Arrow data stays on the vectorized stage paths as everywhere else in
this repo.
"""

from __future__ import annotations

import math
import struct

__all__ = [
    "WasmTrap", "WasmExit", "Module", "Instance", "HostFunc",
    "decode_module", "wasi_imports",
]

PAGE = 65536

I32, I64, F32, F64 = 0x7F, 0x7E, 0x7D, 0x7C
FUNCREF, EXTERNREF = 0x70, 0x6F
_VALTYPES = {I32, I64, F32, F64, FUNCREF, EXTERNREF}

_U32MASK = 0xFFFFFFFF
_U64MASK = 0xFFFFFFFFFFFFFFFF


class WasmTrap(RuntimeError):
    """Execution trapped (spec 4.4: unreachable, OOB, div0, …)."""


class WasmExit(Exception):
    """wasi proc_exit — carries the module's exit code."""

    def __init__(self, code: int):
        super().__init__(f"proc_exit({code})")
        self.code = code


# ---------------------------------------------------------------------------
# binary reader
# ---------------------------------------------------------------------------

class _Reader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def byte(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def bytes(self, n: int) -> bytes:
        v = self.b[self.i:self.i + n]
        if len(v) != n:
            raise WasmTrap("unexpected end of section")
        self.i += n
        return bytes(v)

    def u32(self) -> int:
        r, s = 0, 0
        while True:
            b = self.byte()
            r |= (b & 0x7F) << s
            if not b & 0x80:
                return r
            s += 7
            if s > 34:
                raise WasmTrap("u32 LEB too long")

    def s32(self) -> int:
        return self._sleb(32)

    def s33(self) -> int:
        return self._sleb(33)

    def s64(self) -> int:
        return self._sleb(64)

    def _sleb(self, bits: int) -> int:
        r, s = 0, 0
        while True:
            b = self.byte()
            r |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                if s < bits and (b & 0x40):
                    r |= -(1 << s)
                return r
            if s > bits + 7:
                raise WasmTrap("sleb too long")

    def f32(self) -> float:
        return struct.unpack("<f", self.bytes(4))[0]

    def f64(self) -> float:
        return struct.unpack("<d", self.bytes(8))[0]

    def name(self) -> str:
        return self.bytes(self.u32()).decode("utf-8")


# ---------------------------------------------------------------------------
# module structures
# ---------------------------------------------------------------------------

class FuncType:
    __slots__ = ("params", "results")

    def __init__(self, params, results):
        self.params = params
        self.results = results

    def __eq__(self, o):
        return (isinstance(o, FuncType) and self.params == o.params
                and self.results == o.results)

    def __hash__(self):
        return hash((tuple(self.params), tuple(self.results)))


class HostFunc:
    """An import provided by the embedder. ``fn(instance, *args)`` →
    tuple of results (or None). The instance argument gives host
    functions linear-memory access, mirroring wazero's api.Module
    parameter (functions.go:23)."""

    __slots__ = ("type", "fn", "name")

    def __init__(self, params, results, fn, name="host"):
        self.type = FuncType(list(params), list(results))
        self.fn = fn
        self.name = name


class _Code:
    __slots__ = ("locals", "ops")

    def __init__(self, locals_, ops):
        self.locals = locals_
        self.ops = ops


class Module:
    def __init__(self):
        self.types: list[FuncType] = []
        self.imports: list[tuple] = []      # (mod, name, kind, desc)
        self.funcs: list[int] = []          # typeidx of local funcs
        self.tables: list[tuple] = []       # (elemtype, min, max)
        self.memories: list[tuple] = []     # (min, max)
        self.globals: list[tuple] = []      # (valtype, mut, init_ops)
        self.exports: dict[str, tuple] = {}  # name -> (kind, idx)
        self.start: int | None = None
        self.elements: list[tuple] = []     # (tableidx, offset_ops, idxs)
        self.codes: list[_Code] = []
        self.data: list[tuple] = []         # (memidx|None, offset_ops, bytes)
        self.n_imported_funcs = 0
        self.n_imported_globals = 0
        self.n_imported_tables = 0
        self.n_imported_mems = 0


def _decode_valtypes(r: _Reader) -> list[int]:
    n = r.u32()
    out = []
    for _ in range(n):
        t = r.byte()
        if t not in _VALTYPES:
            raise WasmTrap(f"bad valtype 0x{t:02x}")
        out.append(t)
    return out


def _decode_limits(r: _Reader) -> tuple[int, int | None]:
    flag = r.byte()
    lo = r.u32()
    hi = r.u32() if flag & 1 else None
    return lo, hi


# ---------------------------------------------------------------------------
# body pre-decoding: flat op list + resolved branch targets
# ---------------------------------------------------------------------------

# control ops get immediates rewritten during the fixup pass below
_BLOCK, _LOOP, _IF = 0x02, 0x03, 0x04
_ELSE, _END = 0x05, 0x0B

_MEM_OPS = set(range(0x28, 0x3F))       # loads/stores (align, offset)
_ONE_U32 = {0x0C, 0x0D, 0x10, 0x20, 0x21, 0x22, 0x23, 0x24,
            0x25, 0x26, 0x3F, 0x40, 0xD2}
_NO_IMM = (set(range(0x45, 0xC5)) - {0x00}) | {
    0x00, 0x01, 0x05, 0x0B, 0x0F, 0x1A, 0x1B, 0xD1}


def _decode_body(r: _Reader, end: int, module: Module,
                 func_types: list[FuncType]) -> list:
    """Decode one expression (function body / init expr) into a flat
    op list. Branch immediates become (label_depth,) at first; the
    fixup pass converts structured control into absolute targets:

    - block/loop/if ops carry (arity, param_arity, else_pc, end_pc)
    - br/br_if carry the label depth (resolved at runtime against the
      interpreter's label stack — depths are static so this is O(1))
    """
    ops: list = []
    depth = 0
    while r.i < end:
        op = r.byte()
        if op == _END and depth == 0:
            # the expression's own terminator (function bodies and
            # init exprs both end here — section `end` may lie beyond)
            ops.append((op, None))
            break
        if op in (_BLOCK, _LOOP, _IF):
            depth += 1
            bt = r.s33()
            ops.append([op, bt, -1, -1])   # else_pc, end_pc patched below
        elif op == _ELSE:
            ops.append([op, -1])           # end_pc patched
        elif op == 0x0E:                   # br_table
            n = r.u32()
            tgts = [r.u32() for _ in range(n)]
            tgts.append(r.u32())
            ops.append((op, tgts))
        elif op == 0x11:                   # call_indirect
            ops.append((op, (r.u32(), r.u32())))
        elif op in _MEM_OPS:
            r.u32()                        # align hint — unused
            ops.append((op, r.u32()))
        elif op in _ONE_U32:
            ops.append((op, r.u32()))
        elif op == 0x41:
            ops.append((op, r.s32() & _U32MASK))
        elif op == 0x42:
            ops.append((op, r.s64() & _U64MASK))
        elif op == 0x43:
            ops.append((op, r.f32()))
        elif op == 0x44:
            ops.append((op, r.f64()))
        elif op == 0x1C:                   # select t*
            _decode_valtypes(r)
            ops.append((0x1B, None))
        elif op == 0xD0:                   # ref.null t
            r.byte()
            ops.append((op, None))
        elif op == 0xFC:
            sub = r.u32()
            if sub in (0, 1, 2, 3, 4, 5, 6, 7):        # sat trunc
                ops.append((0xFC00 | sub, None))
            elif sub == 8:                              # memory.init
                seg = r.u32(); r.byte()
                ops.append((0xFC08, seg))
            elif sub == 9:                              # data.drop
                ops.append((0xFC09, r.u32()))
            elif sub == 10:                             # memory.copy
                r.byte(); r.byte()
                ops.append((0xFC0A, None))
            elif sub == 11:                             # memory.fill
                r.byte()
                ops.append((0xFC0B, None))
            elif sub == 12:                             # table.init
                seg = r.u32(); tab = r.u32()
                ops.append((0xFC0C, (seg, tab)))
            elif sub == 13:                             # elem.drop
                ops.append((0xFC0D, r.u32()))
            elif sub == 14:                             # table.copy
                ops.append((0xFC0E, (r.u32(), r.u32())))
            elif sub == 15:                             # table.grow
                ops.append((0xFC0F, r.u32()))
            elif sub == 16:                             # table.size
                ops.append((0xFC10, r.u32()))
            elif sub == 17:                             # table.fill
                ops.append((0xFC11, r.u32()))
            else:
                raise WasmTrap(f"unsupported 0xFC opcode {sub}")
        elif op in _NO_IMM:
            if op == _END:
                depth -= 1
            ops.append((op, None))
        else:
            raise WasmTrap(f"unsupported opcode 0x{op:02x}")

    # fixup pass: match block/loop/if with else/end
    stack: list[int] = []
    for pc, o in enumerate(ops):
        op = o[0]
        if op in (_BLOCK, _LOOP, _IF):
            stack.append(pc)
        elif op == _ELSE:
            opener = ops[stack[-1]]
            opener[2] = pc                 # if's else_pc
            o[1] = -1                      # patched at end
        elif op == _END:
            if stack:
                opc = stack.pop()
                opener = ops[opc]
                opener[3] = pc
                if opener[2] >= 0:         # patch the else's end too
                    ops[opener[2]][1] = pc

    # resolve block arities against the type section
    def _bt_arity(bt: int) -> tuple[int, int]:
        if bt == -0x40:                    # 0x40 as s33 → empty
            return 0, 0
        if bt < 0:                         # single valtype (negative s33)
            return 0, 1
        ft = func_types[bt]
        return len(ft.params), len(ft.results)

    out: list = []
    for o in ops:
        if o[0] in (_BLOCK, _LOOP, _IF):
            pa, ra = _bt_arity(o[1])
            out.append((o[0], (pa, ra, o[2], o[3])))
        elif o[0] == _ELSE:
            out.append((o[0], o[1]))
        else:
            out.append(tuple(o) if isinstance(o, list) else o)
    return out


def decode_module(binary: bytes) -> Module:
    if binary[:4] != b"\x00asm":
        raise WasmTrap("bad wasm magic")
    if binary[4:8] != b"\x01\x00\x00\x00":
        raise WasmTrap("unsupported wasm version")
    m = Module()
    r = _Reader(binary, 8)
    n = len(binary)
    while r.i < n:
        sid = r.byte()
        size = r.u32()
        end = r.i + size
        if sid == 1:                       # types
            for _ in range(r.u32()):
                if r.byte() != 0x60:
                    raise WasmTrap("bad functype tag")
                m.types.append(FuncType(_decode_valtypes(r),
                                        _decode_valtypes(r)))
        elif sid == 2:                     # imports
            for _ in range(r.u32()):
                mod, nm, kind = r.name(), r.name(), r.byte()
                if kind == 0:
                    desc = r.u32()
                    m.n_imported_funcs += 1
                elif kind == 1:
                    et = r.byte()
                    desc = (et, *_decode_limits(r))
                    m.n_imported_tables += 1
                elif kind == 2:
                    desc = _decode_limits(r)
                    m.n_imported_mems += 1
                elif kind == 3:
                    desc = (r.byte(), r.byte())
                    m.n_imported_globals += 1
                else:
                    raise WasmTrap("bad import kind")
                m.imports.append((mod, nm, kind, desc))
        elif sid == 3:                     # functions
            m.funcs = [r.u32() for _ in range(r.u32())]
        elif sid == 4:                     # tables
            for _ in range(r.u32()):
                et = r.byte()
                lo, hi = _decode_limits(r)
                m.tables.append((et, lo, hi))
        elif sid == 5:                     # memories
            for _ in range(r.u32()):
                m.memories.append(_decode_limits(r))
        elif sid == 6:                     # globals
            for _ in range(r.u32()):
                vt, mut = r.byte(), r.byte()
                init = _decode_body(r, end, m, m.types)
                m.globals.append((vt, mut, init))
        elif sid == 7:                     # exports
            for _ in range(r.u32()):
                nm = r.name()
                m.exports[nm] = (r.byte(), r.u32())
        elif sid == 8:
            m.start = r.u32()
        elif sid == 9:                     # elements
            for _ in range(r.u32()):
                flags = r.u32()
                if flags == 0:
                    off = _decode_body(r, end, m, m.types)
                    idxs = [r.u32() for _ in range(r.u32())]
                    m.elements.append((0, off, idxs))
                elif flags == 2:
                    tab = r.u32()
                    off = _decode_body(r, end, m, m.types)
                    if r.byte() != 0:
                        raise WasmTrap("bad elemkind")
                    idxs = [r.u32() for _ in range(r.u32())]
                    m.elements.append((tab, off, idxs))
                elif flags == 1:           # passive, elemkind
                    if r.byte() != 0:
                        raise WasmTrap("bad elemkind")
                    idxs = [r.u32() for _ in range(r.u32())]
                    m.elements.append((None, None, idxs))
                else:
                    raise WasmTrap(f"unsupported element flags {flags}")
        elif sid == 10:                    # code
            for _ in range(r.u32()):
                bsize = r.u32()
                bend = r.i + bsize
                locals_ = []
                for _ in range(r.u32()):
                    cnt, vt = r.u32(), r.byte()
                    locals_.extend([vt] * cnt)
                ops = _decode_body(r, bend, m, m.types)
                r.i = bend
                m.codes.append(_Code(locals_, ops))
        elif sid == 11:                    # data
            for _ in range(r.u32()):
                flags = r.u32()
                if flags == 0:
                    off = _decode_body(r, end, m, m.types)
                    m.data.append((0, off, r.bytes(r.u32())))
                elif flags == 1:           # passive
                    m.data.append((None, None, r.bytes(r.u32())))
                elif flags == 2:
                    mi = r.u32()
                    off = _decode_body(r, end, m, m.types)
                    m.data.append((mi, off, r.bytes(r.u32())))
                else:
                    raise WasmTrap(f"bad data flags {flags}")
        else:                              # custom / datacount: skip
            r.i = end
        if r.i != end:
            if sid in (0, 12):
                r.i = end
            else:
                raise WasmTrap(f"section {sid} size mismatch")
    return m


# ---------------------------------------------------------------------------
# numeric helpers
# ---------------------------------------------------------------------------

def _s32(v: int) -> int:
    return v - (1 << 32) if v & 0x80000000 else v


def _s64(v: int) -> int:
    return v - (1 << 64) if v & 0x8000000000000000 else v


def _f32(v: float) -> float:
    try:
        return struct.unpack("<f", struct.pack("<f", v))[0]
    except OverflowError:
        # IEEE 754 round-to-nearest: a finite f64 beyond f32 range
        # rounds to ±inf (struct raises instead of rounding)
        return math.copysign(math.inf, v)


def _pack_f32(v: float) -> bytes:
    try:
        return struct.pack("<f", v)
    except OverflowError:
        return struct.pack("<f", math.copysign(math.inf, v))


def _trunc(v: float, lo: int, hi: int, mask: int) -> int:
    if math.isnan(v):
        raise WasmTrap("invalid conversion to integer")
    t = math.trunc(v)
    if t < lo or t > hi:
        raise WasmTrap("integer overflow")
    return int(t) & mask


def _trunc_sat(v: float, lo: int, hi: int, mask: int) -> int:
    if math.isnan(v):
        return 0
    t = math.trunc(v) if not math.isinf(v) else (lo if v < 0 else hi)
    return max(lo, min(hi, int(t))) & mask


def _nearest(v: float) -> float:
    if math.isnan(v) or math.isinf(v):
        return v
    f = math.floor(v)
    d = v - f
    if d < 0.5:
        r = f
    elif d > 0.5:
        r = f + 1
    else:                                  # ties to even
        r = f if f % 2 == 0 else f + 1
    return float(r) if r != 0 else math.copysign(0.0, v)


def _fmin(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == b == 0:
        return -0.0 if (math.copysign(1, a) < 0
                        or math.copysign(1, b) < 0) else 0.0
    return min(a, b)


def _fmax(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == b == 0:
        return 0.0 if (math.copysign(1, a) > 0
                       or math.copysign(1, b) > 0) else -0.0
    return max(a, b)


_ZEROVAL = {I32: 0, I64: 0, F32: 0.0, F64: 0.0,
            FUNCREF: None, EXTERNREF: None}


# ---------------------------------------------------------------------------
# instance + interpreter
# ---------------------------------------------------------------------------

class _Label:
    __slots__ = ("pc", "arity", "height", "is_loop")

    def __init__(self, pc, arity, height, is_loop):
        self.pc = pc
        self.arity = arity
        self.height = height
        self.is_loop = is_loop


class _Func:
    __slots__ = ("type", "code")

    def __init__(self, ftype, code):
        self.type = ftype
        self.code = code


class Instance:
    """An instantiated module: resolved imports, linear memory, table,
    globals, and ``exports`` as directly-callable Python functions
    (ints/floats in, tuple-or-scalar out)."""

    MAX_CALL_DEPTH = 500

    def __init__(self, module: Module,
                 imports: dict[tuple[str, str], object] | None = None,
                 mem_limit_pages: int = 1024):
        self.module = module
        self.mem_limit_pages = mem_limit_pages
        imports = imports or {}
        self.funcs: list = []              # HostFunc | _Func
        self.globals: list = []
        self.tables: list[list] = []
        self.memory = bytearray()
        self.mem_pages = 0
        self.dropped_data: set[int] = set()
        self.dropped_elems: set[int] = set()

        for mod, nm, kind, desc in module.imports:
            imp = imports.get((mod, nm))
            if kind == 0:
                if not isinstance(imp, HostFunc):
                    raise WasmTrap(
                        f"unresolved function import {mod}.{nm}")
                want = module.types[desc]
                if imp.type != want:
                    raise WasmTrap(
                        f"import {mod}.{nm} signature mismatch")
                self.funcs.append(imp)
            elif kind == 3:
                self.globals.append(imp if imp is not None
                                    else _ZEROVAL[desc[0]])
            elif kind == 1:
                self.tables.append(list(imp) if imp is not None else [])
            elif kind == 2:
                lo = desc[0]
                self.memory = bytearray(lo * PAGE)
                self.mem_pages = lo

        for i, ti in enumerate(module.funcs):
            self.funcs.append(_Func(module.types[ti], module.codes[i]))

        for et, lo, hi in module.tables:
            self.tables.append([None] * lo)
        for lo, hi in module.memories:
            self.memory = bytearray(lo * PAGE)
            self.mem_pages = lo
            self.mem_max = hi

        for vt, mut, init in module.globals:
            self.globals.append(self._eval_const(init))

        for tab, off, idxs in module.elements:
            if tab is None:
                continue
            base = self._eval_const(off)
            t = self.tables[tab]
            if base + len(idxs) > len(t):
                raise WasmTrap("element segment out of bounds")
            for j, fi in enumerate(idxs):
                t[base + j] = fi
        for seg_i, (mi, off, blob) in enumerate(module.data):
            if mi is None:
                continue
            base = self._eval_const(off)
            if base + len(blob) > len(self.memory):
                raise WasmTrap("data segment out of bounds")
            self.memory[base:base + len(blob)] = blob

        self.exports: dict[str, object] = {}
        for nm, (kind, idx) in module.exports.items():
            if kind == 0:
                self.exports[nm] = self._make_export(idx)
            elif kind == 2:
                self.exports[nm] = "memory"
            elif kind == 3:
                self.exports[nm] = ("global", idx)

        if module.start is not None:
            self.invoke(module.start, [])

    # -- embedder surface --------------------------------------------------

    def _make_export(self, idx: int):
        def call(*args):
            res = self.invoke(idx, list(args))
            if not res:
                return None
            return res[0] if len(res) == 1 else tuple(res)
        call.func_index = idx
        return call

    def read_memory(self, ptr: int, n: int) -> bytes:
        if ptr < 0 or n < 0 or ptr + n > len(self.memory):
            raise WasmTrap("out-of-bounds host memory read")
        return bytes(self.memory[ptr:ptr + n])

    def write_memory(self, ptr: int, data: bytes) -> None:
        if ptr < 0 or ptr + len(data) > len(self.memory):
            raise WasmTrap("out-of-bounds host memory write")
        self.memory[ptr:ptr + len(data)] = data

    def _eval_const(self, ops) -> object:
        st: list = []
        for op, imm in ops:
            if op == 0x41 or op == 0x42:
                st.append(imm)
            elif op == 0x43 or op == 0x44:
                st.append(imm)
            elif op == 0x23:
                st.append(self.globals[imm])
            elif op == 0xD0:
                st.append(None)
            elif op == 0xD2:
                st.append(imm)
            elif op == _END:
                break
            else:
                raise WasmTrap(f"non-constant init op 0x{op:02x}")
        return st[-1] if st else 0

    # -- the interpreter ---------------------------------------------------

    def invoke(self, fidx: int, args: list, depth: int = 0) -> list:
        f = self.funcs[fidx]
        if isinstance(f, HostFunc):
            res = f.fn(self, *args)
            if res is None:
                return []
            if isinstance(res, (list, tuple)):
                return list(res)
            return [res]
        if depth > self.MAX_CALL_DEPTH:
            raise WasmTrap("call stack exhausted")

        code = f.code
        locals_ = list(args)
        for vt in code.locals:
            locals_.append(_ZEROVAL[vt])
        ops = code.ops
        n_ops = len(ops)
        ret_arity = len(f.type.results)
        stack: list = []
        labels: list[_Label] = [_Label(n_ops, ret_arity, 0, False)]
        mem = self.memory
        pc = 0

        while pc < n_ops:
            op, imm = ops[pc]
            pc += 1

            # ---- control -------------------------------------------------
            if op == 0x20:                              # local.get
                stack.append(locals_[imm])
            elif op == 0x21:                            # local.set
                locals_[imm] = stack.pop()
            elif op == 0x22:                            # local.tee
                locals_[imm] = stack[-1]
            elif op == 0x41 or op == 0x42 or op == 0x43 or op == 0x44:
                stack.append(imm)
            elif op == _BLOCK:
                pa, ra, _e, end_pc = imm
                labels.append(_Label(end_pc + 1, ra,
                                     len(stack) - pa, False))
            elif op == _LOOP:
                pa, ra, _e, end_pc = imm
                labels.append(_Label(pc - 1 + 1, pa,
                                     len(stack) - pa, True))
            elif op == _IF:
                pa, ra, else_pc, end_pc = imm
                cond = stack.pop()
                labels.append(_Label(end_pc + 1, ra,
                                     len(stack) - pa, False))
                if not cond:
                    pc = (else_pc + 1) if else_pc >= 0 else end_pc
            elif op == _ELSE:
                # reached by falling out of the true arm → jump to end
                pc = imm
            elif op == _END:
                if labels:
                    labels.pop()
            elif op == 0x0C:                            # br
                pc = self._br(stack, labels, imm)
            elif op == 0x0D:                            # br_if
                if stack.pop():
                    pc = self._br(stack, labels, imm)
            elif op == 0x0E:                            # br_table
                i = stack.pop()
                tgt = imm[i] if i < len(imm) - 1 else imm[-1]
                pc = self._br(stack, labels, tgt)
            elif op == 0x0F:                            # return
                return stack[len(stack) - ret_arity:] if ret_arity \
                    else []
            elif op == 0x10:                            # call
                callee = self.funcs[imm]
                na = len(callee.type.params)
                cargs = stack[len(stack) - na:] if na else []
                if na:
                    del stack[len(stack) - na:]
                stack.extend(self.invoke(imm, cargs, depth + 1))
            elif op == 0x11:                            # call_indirect
                ti, tab = imm
                elem = stack.pop()
                table = self.tables[tab]
                if elem >= len(table) or table[elem] is None:
                    raise WasmTrap("undefined table element")
                fi = table[elem]
                if self.funcs[fi].type != self.module.types[ti]:
                    raise WasmTrap("indirect call type mismatch")
                na = len(self.funcs[fi].type.params)
                cargs = stack[len(stack) - na:] if na else []
                if na:
                    del stack[len(stack) - na:]
                stack.extend(self.invoke(fi, cargs, depth + 1))
            elif op == 0x00:
                raise WasmTrap("unreachable")
            elif op == 0x01:
                pass
            elif op == 0x1A:                            # drop
                stack.pop()
            elif op == 0x1B:                            # select
                c = stack.pop()
                b = stack.pop()
                a = stack.pop()
                stack.append(a if c else b)
            elif op == 0x23:                            # global.get
                stack.append(self.globals[imm])
            elif op == 0x24:                            # global.set
                self.globals[imm] = stack.pop()

            # ---- memory --------------------------------------------------
            elif 0x28 <= op <= 0x3E:
                self._memop(op, imm, stack, mem)
            elif op == 0x3F:                            # memory.size
                stack.append(self.mem_pages)
            elif op == 0x40:                            # memory.grow
                delta = stack.pop()
                cur = self.mem_pages
                new = cur + delta
                maxp = getattr(self, "mem_max", None)
                limit = min(self.mem_limit_pages,
                            maxp if maxp is not None else 1 << 16)
                if new > limit:
                    stack.append(_U32MASK)              # -1
                else:
                    self.memory.extend(b"\x00" * (delta * PAGE))
                    self.mem_pages = new
                    mem = self.memory
                    stack.append(cur)

            # ---- numerics ------------------------------------------------
            else:
                self._numop(op, imm, stack)
        return stack[len(stack) - ret_arity:] if ret_arity else []

    def _br(self, stack: list, labels: list[_Label], depth: int) -> int:
        L = labels[-1 - depth]
        if L.arity:
            vals = stack[len(stack) - L.arity:]
            del stack[L.height:]
            stack.extend(vals)
        else:
            del stack[L.height:]
        if L.is_loop:
            del labels[len(labels) - depth:]
        else:
            del labels[len(labels) - depth - 1:]
        return L.pc

    # -- memory ops --------------------------------------------------------

    def _memop(self, op: int, off: int, stack: list,
               mem: bytearray) -> None:
        if op >= 0x36:                                  # stores
            val = stack.pop()
            addr = stack.pop() + off
            if op == 0x36:                              # i32.store
                n, data = 4, (val & _U32MASK).to_bytes(4, "little")
            elif op == 0x37:                            # i64.store
                n, data = 8, (val & _U64MASK).to_bytes(8, "little")
            elif op == 0x38:
                n, data = 4, _pack_f32(val)
            elif op == 0x39:
                n, data = 8, struct.pack("<d", val)
            elif op == 0x3A:                            # i32.store8
                n, data = 1, bytes(((val & 0xFF),))
            elif op == 0x3B:                            # i32.store16
                n, data = 2, (val & 0xFFFF).to_bytes(2, "little")
            elif op == 0x3C:                            # i64.store8
                n, data = 1, bytes(((val & 0xFF),))
            elif op == 0x3D:
                n, data = 2, (val & 0xFFFF).to_bytes(2, "little")
            else:                                       # i64.store32
                n, data = 4, (val & _U32MASK).to_bytes(4, "little")
            if addr + n > len(mem):
                raise WasmTrap("out of bounds memory access")
            mem[addr:addr + n] = data
            return
        addr = stack.pop() + off
        if op == 0x28:                                  # i32.load
            n = 4
        elif op == 0x29:
            n = 8
        elif op == 0x2A or op == 0x35 or op == 0x34:
            n = 4
        elif op == 0x2B:
            n = 8
        elif op in (0x2C, 0x2D, 0x30, 0x31):
            n = 1
        elif op in (0x2E, 0x2F, 0x32, 0x33):
            n = 2
        if addr < 0 or addr + n > len(mem):
            raise WasmTrap("out of bounds memory access")
        raw = bytes(mem[addr:addr + n])
        if op == 0x28:
            stack.append(int.from_bytes(raw, "little"))
        elif op == 0x29:
            stack.append(int.from_bytes(raw, "little"))
        elif op == 0x2A:
            stack.append(struct.unpack("<f", raw)[0])
        elif op == 0x2B:
            stack.append(struct.unpack("<d", raw)[0])
        elif op == 0x2C:                                # i32.load8_s
            stack.append(int.from_bytes(raw, "little",
                                        signed=True) & _U32MASK)
        elif op == 0x2D:                                # i32.load8_u
            stack.append(raw[0])
        elif op == 0x2E:                                # i32.load16_s
            stack.append(int.from_bytes(raw, "little",
                                        signed=True) & _U32MASK)
        elif op == 0x2F:
            stack.append(int.from_bytes(raw, "little"))
        elif op == 0x30:                                # i64.load8_s
            stack.append(int.from_bytes(raw, "little",
                                        signed=True) & _U64MASK)
        elif op == 0x31:
            stack.append(raw[0])
        elif op == 0x32:
            stack.append(int.from_bytes(raw, "little",
                                        signed=True) & _U64MASK)
        elif op == 0x33:
            stack.append(int.from_bytes(raw, "little"))
        elif op == 0x34:                                # i64.load32_s
            stack.append(int.from_bytes(raw, "little",
                                        signed=True) & _U64MASK)
        else:                                           # i64.load32_u
            stack.append(int.from_bytes(raw, "little"))

    # -- numeric / conversion / bulk ops -----------------------------------

    def _numop(self, op: int, imm, stack: list) -> None:
        s = stack
        if op == 0x45:                                  # i32.eqz
            s[-1] = 1 if s[-1] == 0 else 0
        elif op == 0x50:                                # i64.eqz
            s[-1] = 1 if s[-1] == 0 else 0
        elif 0x46 <= op <= 0x4F:                        # i32 cmps
            b = s.pop(); a = s.pop()
            if op == 0x46:
                r = a == b
            elif op == 0x47:
                r = a != b
            elif op == 0x48:
                r = _s32(a) < _s32(b)
            elif op == 0x49:
                r = a < b
            elif op == 0x4A:
                r = _s32(a) > _s32(b)
            elif op == 0x4B:
                r = a > b
            elif op == 0x4C:
                r = _s32(a) <= _s32(b)
            elif op == 0x4D:
                r = a <= b
            elif op == 0x4E:
                r = _s32(a) >= _s32(b)
            else:
                r = a >= b
            s.append(1 if r else 0)
        elif 0x51 <= op <= 0x5A:                        # i64 cmps
            b = s.pop(); a = s.pop()
            if op == 0x51:
                r = a == b
            elif op == 0x52:
                r = a != b
            elif op == 0x53:
                r = _s64(a) < _s64(b)
            elif op == 0x54:
                r = a < b
            elif op == 0x55:
                r = _s64(a) > _s64(b)
            elif op == 0x56:
                r = a > b
            elif op == 0x57:
                r = _s64(a) <= _s64(b)
            elif op == 0x58:
                r = a <= b
            elif op == 0x59:
                r = _s64(a) >= _s64(b)
            else:
                r = a >= b
            s.append(1 if r else 0)
        elif 0x5B <= op <= 0x66:                        # float cmps
            b = s.pop(); a = s.pop()
            k = (op - 0x5B) % 6
            if k == 0:
                r = a == b
            elif k == 1:
                r = a != b
            elif k == 2:
                r = a < b
            elif k == 3:
                r = a > b
            elif k == 4:
                r = a <= b
            else:
                r = a >= b
            s.append(1 if r else 0)
        elif op == 0x67:                                # i32.clz
            v = s[-1]
            s[-1] = 32 - v.bit_length() if v else 32
        elif op == 0x68:                                # i32.ctz
            v = s[-1]
            s[-1] = (v & -v).bit_length() - 1 if v else 32
        elif op == 0x69:                                # i32.popcnt
            s[-1] = bin(s[-1]).count("1")
        elif 0x6A <= op <= 0x78:                        # i32 arith
            b = s.pop(); a = s.pop()
            if op == 0x6A:
                r = a + b
            elif op == 0x6B:
                r = a - b
            elif op == 0x6C:
                r = a * b
            elif op == 0x6D:                            # div_s
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                if _s32(a) == -0x80000000 and _s32(b) == -1:
                    raise WasmTrap("integer overflow")
                q = abs(_s32(a)) // abs(_s32(b))
                r = q if (_s32(a) < 0) == (_s32(b) < 0) else -q
            elif op == 0x6E:                            # div_u
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                r = a // b
            elif op == 0x6F:                            # rem_s
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                r = abs(_s32(a)) % abs(_s32(b))
                if _s32(a) < 0:
                    r = -r
            elif op == 0x70:                            # rem_u
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                r = a % b
            elif op == 0x71:
                r = a & b
            elif op == 0x72:
                r = a | b
            elif op == 0x73:
                r = a ^ b
            elif op == 0x74:
                r = a << (b % 32)
            elif op == 0x75:                            # shr_s
                r = _s32(a) >> (b % 32)
            elif op == 0x76:                            # shr_u
                r = a >> (b % 32)
            elif op == 0x77:                            # rotl
                k = b % 32
                r = (a << k) | (a >> (32 - k)) if k else a
            else:                                       # rotr
                k = b % 32
                r = (a >> k) | (a << (32 - k)) if k else a
            s.append(r & _U32MASK)
        elif op == 0x79:                                # i64.clz
            v = s[-1]
            s[-1] = 64 - v.bit_length() if v else 64
        elif op == 0x7A:
            v = s[-1]
            s[-1] = (v & -v).bit_length() - 1 if v else 64
        elif op == 0x7B:
            s[-1] = bin(s[-1]).count("1")
        elif 0x7C <= op <= 0x8A:                        # i64 arith
            b = s.pop(); a = s.pop()
            if op == 0x7C:
                r = a + b
            elif op == 0x7D:
                r = a - b
            elif op == 0x7E:
                r = a * b
            elif op == 0x7F:
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                if _s64(a) == -(1 << 63) and _s64(b) == -1:
                    raise WasmTrap("integer overflow")
                q = abs(_s64(a)) // abs(_s64(b))
                r = q if (_s64(a) < 0) == (_s64(b) < 0) else -q
            elif op == 0x80:
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                r = a // b
            elif op == 0x81:
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                r = abs(_s64(a)) % abs(_s64(b))
                if _s64(a) < 0:
                    r = -r
            elif op == 0x82:
                if b == 0:
                    raise WasmTrap("integer divide by zero")
                r = a % b
            elif op == 0x83:
                r = a & b
            elif op == 0x84:
                r = a | b
            elif op == 0x85:
                r = a ^ b
            elif op == 0x86:
                r = a << (b % 64)
            elif op == 0x87:
                r = _s64(a) >> (b % 64)
            elif op == 0x88:
                r = a >> (b % 64)
            elif op == 0x89:
                k = b % 64
                r = (a << k) | (a >> (64 - k)) if k else a
            else:
                k = b % 64
                r = (a >> k) | (a << (64 - k)) if k else a
            s.append(r & _U64MASK)
        elif 0x8B <= op <= 0x98:                        # f32 unary/binary
            if op <= 0x91:
                v = s.pop()
                if op == 0x8B:
                    r = abs(v)
                elif op == 0x8C:
                    r = -v
                elif op == 0x8D:
                    r = math.ceil(v) if math.isfinite(v) else v
                elif op == 0x8E:
                    r = math.floor(v) if math.isfinite(v) else v
                elif op == 0x8F:
                    r = math.trunc(v) if math.isfinite(v) else v
                elif op == 0x90:
                    r = _nearest(v)
                else:
                    r = math.sqrt(v) if v >= 0 else math.nan
                s.append(_f32(float(r)))
            else:
                b = s.pop(); a = s.pop()
                if op == 0x92:
                    r = a + b
                elif op == 0x93:
                    r = a - b
                elif op == 0x94:
                    r = a * b
                elif op == 0x95:
                    if b == 0:
                        r = (math.nan if (a != a or a == 0)
                             else math.copysign(math.inf, a)
                             * math.copysign(1, b))
                    else:
                        r = a / b
                elif op == 0x96:
                    r = _fmin(a, b)
                elif op == 0x97:
                    r = _fmax(a, b)
                else:
                    r = math.copysign(abs(a), b)
                s.append(_f32(r))
        elif 0x99 <= op <= 0xA6:                        # f64
            if op <= 0x9F:
                v = s.pop()
                if op == 0x99:
                    r = abs(v)
                elif op == 0x9A:
                    r = -v
                elif op == 0x9B:
                    r = math.ceil(v) if math.isfinite(v) else v
                elif op == 0x9C:
                    r = math.floor(v) if math.isfinite(v) else v
                elif op == 0x9D:
                    r = math.trunc(v) if math.isfinite(v) else v
                elif op == 0x9E:
                    r = _nearest(v)
                else:
                    r = math.sqrt(v) if v >= 0 else math.nan
                s.append(float(r))
            else:
                b = s.pop(); a = s.pop()
                if op == 0xA0:
                    r = a + b
                elif op == 0xA1:
                    r = a - b
                elif op == 0xA2:
                    r = a * b
                elif op == 0xA3:
                    if b == 0:
                        r = (math.nan if (a != a or a == 0)
                             else math.copysign(math.inf, a)
                             * math.copysign(1, b))
                    else:
                        r = a / b
                elif op == 0xA4:
                    r = _fmin(a, b)
                elif op == 0xA5:
                    r = _fmax(a, b)
                else:
                    r = math.copysign(abs(a), b)
                s.append(float(r))
        # conversions -------------------------------------------------------
        elif op == 0xA7:                                # i32.wrap_i64
            s[-1] = s[-1] & _U32MASK
        elif op == 0xA8:                                # i32.trunc_f32_s
            s[-1] = _trunc(s[-1], -(1 << 31), (1 << 31) - 1, _U32MASK)
        elif op == 0xA9:
            s[-1] = _trunc(s[-1], 0, (1 << 32) - 1, _U32MASK)
        elif op == 0xAA:
            s[-1] = _trunc(s[-1], -(1 << 31), (1 << 31) - 1, _U32MASK)
        elif op == 0xAB:
            s[-1] = _trunc(s[-1], 0, (1 << 32) - 1, _U32MASK)
        elif op == 0xAC:                                # i64.extend_i32_s
            s[-1] = _s32(s[-1]) & _U64MASK
        elif op == 0xAD:
            pass                                        # extend_i32_u
        elif op == 0xAE:
            s[-1] = _trunc(s[-1], -(1 << 63), (1 << 63) - 1, _U64MASK)
        elif op == 0xAF:
            s[-1] = _trunc(s[-1], 0, (1 << 64) - 1, _U64MASK)
        elif op == 0xB0:
            s[-1] = _trunc(s[-1], -(1 << 63), (1 << 63) - 1, _U64MASK)
        elif op == 0xB1:
            s[-1] = _trunc(s[-1], 0, (1 << 64) - 1, _U64MASK)
        elif op == 0xB2:                                # f32.convert_i32_s
            s[-1] = _f32(float(_s32(s[-1])))
        elif op == 0xB3:
            s[-1] = _f32(float(s[-1]))
        elif op == 0xB4:
            s[-1] = _f32(float(_s64(s[-1])))
        elif op == 0xB5:
            s[-1] = _f32(float(s[-1]))
        elif op == 0xB6:                                # f32.demote_f64
            s[-1] = _f32(s[-1])
        elif op == 0xB7:                                # f64.convert_i32_s
            s[-1] = float(_s32(s[-1]))
        elif op == 0xB8:
            s[-1] = float(s[-1])
        elif op == 0xB9:
            s[-1] = float(_s64(s[-1]))
        elif op == 0xBA:
            s[-1] = float(s[-1])
        elif op == 0xBB:                                # f64.promote_f32
            s[-1] = float(s[-1])
        elif op == 0xBC:                                # i32.reinterpret_f32
            s[-1] = struct.unpack("<I", struct.pack("<f", s[-1]))[0]
        elif op == 0xBD:
            s[-1] = struct.unpack("<Q", struct.pack("<d", s[-1]))[0]
        elif op == 0xBE:
            s[-1] = struct.unpack("<f", struct.pack("<I", s[-1]))[0]
        elif op == 0xBF:
            s[-1] = struct.unpack("<d", struct.pack("<Q", s[-1]))[0]
        elif op == 0xC0:                                # i32.extend8_s
            s[-1] = ((s[-1] & 0xFF) - ((s[-1] & 0x80) << 1)) & _U32MASK
        elif op == 0xC1:
            s[-1] = ((s[-1] & 0xFFFF)
                     - ((s[-1] & 0x8000) << 1)) & _U32MASK
        elif op == 0xC2:                                # i64.extend8_s
            s[-1] = ((s[-1] & 0xFF) - ((s[-1] & 0x80) << 1)) & _U64MASK
        elif op == 0xC3:
            s[-1] = ((s[-1] & 0xFFFF)
                     - ((s[-1] & 0x8000) << 1)) & _U64MASK
        elif op == 0xC4:
            s[-1] = ((s[-1] & _U32MASK)
                     - ((s[-1] & 0x80000000) << 1)) & _U64MASK
        elif op == 0xD0:                                # ref.null
            s.append(None)
        elif op == 0xD1:                                # ref.is_null
            s[-1] = 1 if s[-1] is None else 0
        elif op == 0xD2:                                # ref.func
            s.append(imm)
        # 0xFC extended -----------------------------------------------------
        elif op == 0xFC00:
            s[-1] = _trunc_sat(s[-1], -(1 << 31), (1 << 31) - 1,
                               _U32MASK)
        elif op == 0xFC01:
            s[-1] = _trunc_sat(s[-1], 0, (1 << 32) - 1, _U32MASK)
        elif op == 0xFC02:
            s[-1] = _trunc_sat(s[-1], -(1 << 31), (1 << 31) - 1,
                               _U32MASK)
        elif op == 0xFC03:
            s[-1] = _trunc_sat(s[-1], 0, (1 << 32) - 1, _U32MASK)
        elif op == 0xFC04:
            s[-1] = _trunc_sat(s[-1], -(1 << 63), (1 << 63) - 1,
                               _U64MASK)
        elif op == 0xFC05:
            s[-1] = _trunc_sat(s[-1], 0, (1 << 64) - 1, _U64MASK)
        elif op == 0xFC06:
            s[-1] = _trunc_sat(s[-1], -(1 << 63), (1 << 63) - 1,
                               _U64MASK)
        elif op == 0xFC07:
            s[-1] = _trunc_sat(s[-1], 0, (1 << 64) - 1, _U64MASK)
        elif op == 0xFC08:                              # memory.init
            n = s.pop(); src = s.pop(); dst = s.pop()
            if imm in self.dropped_data:
                if n:
                    raise WasmTrap("data segment dropped")
                return
            blob = self.module.data[imm][2]
            if src + n > len(blob) or dst + n > len(self.memory):
                raise WasmTrap("out of bounds memory.init")
            self.memory[dst:dst + n] = blob[src:src + n]
        elif op == 0xFC09:                              # data.drop
            self.dropped_data.add(imm)
        elif op == 0xFC0A:                              # memory.copy
            n = s.pop(); src = s.pop(); dst = s.pop()
            if src + n > len(self.memory) or dst + n > len(self.memory):
                raise WasmTrap("out of bounds memory.copy")
            self.memory[dst:dst + n] = self.memory[src:src + n]
        elif op == 0xFC0B:                              # memory.fill
            n = s.pop(); val = s.pop(); dst = s.pop()
            if dst + n > len(self.memory):
                raise WasmTrap("out of bounds memory.fill")
            self.memory[dst:dst + n] = bytes((val & 0xFF,)) * n
        elif op == 0xFC0C:                              # table.init
            seg, tab = imm
            n = s.pop(); src = s.pop(); dst = s.pop()
            if seg in self.dropped_elems:
                if n:
                    raise WasmTrap("element segment dropped")
                return
            idxs = self.module.elements[seg][2]
            t = self.tables[tab]
            if src + n > len(idxs) or dst + n > len(t):
                raise WasmTrap("out of bounds table.init")
            t[dst:dst + n] = idxs[src:src + n]
        elif op == 0xFC0D:                              # elem.drop
            self.dropped_elems.add(imm)
        elif op == 0xFC0E:                              # table.copy
            dtab, stab = imm
            n = s.pop(); src = s.pop(); dst = s.pop()
            td, ts = self.tables[dtab], self.tables[stab]
            if src + n > len(ts) or dst + n > len(td):
                raise WasmTrap("out of bounds table.copy")
            td[dst:dst + n] = ts[src:src + n]
        elif op == 0xFC10:                              # table.size
            s.append(len(self.tables[imm]))
        elif op == 0xFC0F:                              # table.grow
            n = s.pop(); val = s.pop()
            t = self.tables[imm]
            sz = len(t)
            t.extend([val] * n)
            s.append(sz)
        elif op == 0xFC11:                              # table.fill
            n = s.pop(); val = s.pop(); i0 = s.pop()
            t = self.tables[imm]
            if i0 + n > len(t):
                raise WasmTrap("out of bounds table.fill")
            for j in range(i0, i0 + n):
                t[j] = val
        elif op == 0x25:                                # table.get
            i0 = s.pop()
            t = self.tables[imm]
            if i0 >= len(t):
                raise WasmTrap("out of bounds table access")
            s.append(t[i0])
        elif op == 0x26:                                # table.set
            v = s.pop(); i0 = s.pop()
            t = self.tables[imm]
            if i0 >= len(t):
                raise WasmTrap("out of bounds table access")
            t[i0] = v
        else:
            raise WasmTrap(f"unhandled opcode 0x{op:02x}")


# ---------------------------------------------------------------------------
# WASI preview1 stubs
# ---------------------------------------------------------------------------

_ERRNO_SUCCESS = 0
_ERRNO_BADF = 8
_ERRNO_NOSYS = 52


def wasi_imports(stdout=None, stderr=None) -> dict:
    """Deterministic ``wasi_snapshot_preview1`` host module — the
    subset Go/TinyGo/Rust wasm binaries link against at startup
    (processor_wazero.go:121 instantiates the same module via wazero).
    fd 1/2 writes append to the passed bytearrays; clocks and
    randomness are deterministic so pipelines stay replayable."""
    state = {"clock": 0, "rng": 0x9E3779B97F4A7C15}

    def fd_write(inst, fd, iovs, n_iovs, n_written_ptr):
        if fd not in (1, 2):
            return (_ERRNO_BADF,)      # only stdout/stderr are open
        total = 0
        sink = stdout if fd == 1 else stderr
        for k in range(n_iovs):
            base = int.from_bytes(
                inst.read_memory(iovs + 8 * k, 4), "little")
            ln = int.from_bytes(
                inst.read_memory(iovs + 8 * k + 4, 4), "little")
            chunk = inst.read_memory(base, ln)
            if sink is not None:
                sink.extend(chunk)
            total += ln
        inst.write_memory(n_written_ptr,
                          total.to_bytes(4, "little"))
        return (_ERRNO_SUCCESS,)

    def proc_exit(inst, code):
        raise WasmExit(code)

    def _zero_counts(inst, count_ptr, size_ptr):
        inst.write_memory(count_ptr, b"\x00\x00\x00\x00")
        inst.write_memory(size_ptr, b"\x00\x00\x00\x00")
        return (_ERRNO_SUCCESS,)

    def _ok_noop(inst, *args):
        return (_ERRNO_SUCCESS,)

    def clock_time_get(inst, clock_id, precision, out_ptr):
        state["clock"] += 1000
        inst.write_memory(out_ptr, state["clock"].to_bytes(8, "little"))
        return (_ERRNO_SUCCESS,)

    def random_get(inst, buf, ln):
        out = bytearray()
        x = state["rng"]
        while len(out) < ln:
            x ^= (x << 13) & _U64MASK
            x ^= x >> 7
            x ^= (x << 17) & _U64MASK
            out.extend(x.to_bytes(8, "little"))
        state["rng"] = x
        inst.write_memory(buf, bytes(out[:ln]))
        return (_ERRNO_SUCCESS,)

    def _badf(inst, *args):
        return (_ERRNO_BADF,)

    W = "wasi_snapshot_preview1"
    i32 = I32

    return {
        (W, "fd_write"): HostFunc([i32] * 4, [i32], fd_write),
        (W, "proc_exit"): HostFunc([i32], [], proc_exit),
        (W, "environ_sizes_get"): HostFunc([i32, i32], [i32],
                                           _zero_counts),
        (W, "environ_get"): HostFunc([i32, i32], [i32], _ok_noop),
        (W, "args_sizes_get"): HostFunc([i32, i32], [i32],
                                        _zero_counts),
        (W, "args_get"): HostFunc([i32, i32], [i32], _ok_noop),
        (W, "clock_time_get"): HostFunc([i32, I64, i32], [i32],
                                        clock_time_get),
        (W, "random_get"): HostFunc([i32, i32], [i32], random_get),
        (W, "fd_close"): HostFunc([i32], [i32], _badf),
        (W, "fd_seek"): HostFunc([i32, I64, i32, i32], [i32], _badf),
        (W, "fd_read"): HostFunc([i32, i32, i32, i32], [i32], _badf),
        (W, "fd_fdstat_get"): HostFunc([i32, i32], [i32], _badf),
        (W, "fd_prestat_get"): HostFunc([i32, i32], [i32], _badf),
        (W, "fd_prestat_dir_name"): HostFunc([i32, i32, i32], [i32],
                                             _badf),
        (W, "sched_yield"): HostFunc([], [i32], _ok_noop),
        (W, "poll_oneoff"): HostFunc([i32, i32, i32, i32], [i32],
                                     lambda inst, *a: (_ERRNO_NOSYS,)),
    }
