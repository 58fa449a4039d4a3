"""Programmatic WebAssembly module builder.

The reference ships TinyGo / Rust example modules compiled out-of-tree
(public/wasm/examples/, built by build.sh — the test suite skips when
the .wasm artifacts are absent). This sandbox has no wasm toolchain,
so test fixtures are assembled directly against the public binary
format: :class:`ModuleBuilder` emits the section layout and ``I``
provides an instruction namespace, which together are enough to write
the reference's ``uppercase`` (TinyGo-style malloc/free ABI) and
``louder`` (Rust-style allocate/deallocate ABI) examples byte-for-byte
semantically.

These builders double as the regression corpus for the interpreter in
:mod:`bento_ray.wasmrt` — every structured-control / memory / numeric
path the fixtures exercise is also unit-tested directly.
"""

from __future__ import annotations

import struct

__all__ = ["ModuleBuilder", "I", "build_uppercase_module",
           "build_louder_module", "build_meta_module"]

_VT = {"i32": 0x7F, "i64": 0x7E, "f32": 0x7D, "f64": 0x7C,
       "funcref": 0x70, "externref": 0x6F}


def uleb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if (v == 0 and not b & 0x40) or (v == -1 and b & 0x40):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


class _I:
    """Instruction emitters (each returns the encoded bytes)."""

    def local_get(self, i):
        return b"\x20" + uleb(i)

    def local_set(self, i):
        return b"\x21" + uleb(i)

    def local_tee(self, i):
        return b"\x22" + uleb(i)

    def global_get(self, i):
        return b"\x23" + uleb(i)

    def global_set(self, i):
        return b"\x24" + uleb(i)

    def i32_const(self, v):
        return b"\x41" + sleb(v)

    def i64_const(self, v):
        return b"\x42" + sleb(v)

    def f32_const(self, v):
        return b"\x43" + struct.pack("<f", v)

    def f64_const(self, v):
        return b"\x44" + struct.pack("<d", v)

    def call(self, i):
        return b"\x10" + uleb(i)

    def call_indirect(self, typeidx, table=0):
        return b"\x11" + uleb(typeidx) + uleb(table)

    def block(self, bt=0x40):
        return b"\x02" + bytes((bt,))

    def loop(self, bt=0x40):
        return b"\x03" + bytes((bt,))

    def if_(self, bt=0x40):
        return b"\x04" + bytes((bt,))

    else_ = b"\x05"
    end = b"\x0B"
    ret = b"\x0F"
    unreachable = b"\x00"
    nop = b"\x01"
    drop = b"\x1A"
    select = b"\x1B"

    def br(self, d):
        return b"\x0C" + uleb(d)

    def br_if(self, d):
        return b"\x0D" + uleb(d)

    def br_table(self, targets, default):
        return (b"\x0E" + uleb(len(targets))
                + b"".join(uleb(t) for t in targets) + uleb(default))

    # memory (align=0 hint, explicit offset)
    def _mem(self, op, offset=0, align=0):
        return bytes((op,)) + uleb(align) + uleb(offset)

    def i32_load(self, offset=0):
        return self._mem(0x28, offset, 2)

    def i64_load(self, offset=0):
        return self._mem(0x29, offset, 3)

    def f64_load(self, offset=0):
        return self._mem(0x2B, offset, 3)

    def i32_load8_u(self, offset=0):
        return self._mem(0x2D, offset)

    def i32_load8_s(self, offset=0):
        return self._mem(0x2C, offset)

    def i32_load16_u(self, offset=0):
        return self._mem(0x2F, offset, 1)

    def i32_store(self, offset=0):
        return self._mem(0x36, offset, 2)

    def i64_store(self, offset=0):
        return self._mem(0x37, offset, 3)

    def f64_store(self, offset=0):
        return self._mem(0x39, offset, 3)

    def i32_store8(self, offset=0):
        return self._mem(0x3A, offset)

    def i32_store16(self, offset=0):
        return self._mem(0x3B, offset, 1)

    memory_size = b"\x3F\x00"
    memory_grow = b"\x40\x00"
    memory_copy = b"\xFC\x0A\x00\x00"
    memory_fill = b"\xFC\x0B\x00"

    # i32
    i32_eqz = b"\x45"
    i32_eq = b"\x46"
    i32_ne = b"\x47"
    i32_lt_s = b"\x48"
    i32_lt_u = b"\x49"
    i32_gt_s = b"\x4A"
    i32_gt_u = b"\x4B"
    i32_le_s = b"\x4C"
    i32_le_u = b"\x4D"
    i32_ge_s = b"\x4E"
    i32_ge_u = b"\x4F"
    i32_add = b"\x6A"
    i32_sub = b"\x6B"
    i32_mul = b"\x6C"
    i32_div_s = b"\x6D"
    i32_div_u = b"\x6E"
    i32_rem_s = b"\x6F"
    i32_rem_u = b"\x70"
    i32_and = b"\x71"
    i32_or = b"\x72"
    i32_xor = b"\x73"
    i32_shl = b"\x74"
    i32_shr_s = b"\x75"
    i32_shr_u = b"\x76"
    i32_rotl = b"\x77"
    i32_clz = b"\x67"
    i32_ctz = b"\x68"
    i32_popcnt = b"\x69"
    # i64
    i64_eq = b"\x51"
    i64_lt_u = b"\x54"
    i64_add = b"\x7C"
    i64_sub = b"\x7D"
    i64_mul = b"\x7E"
    i64_div_s = b"\x7F"
    i64_and = b"\x83"
    i64_or = b"\x84"
    i64_shl = b"\x86"
    i64_shr_u = b"\x88"
    # conversions
    i32_wrap_i64 = b"\xA7"
    i64_extend_i32_u = b"\xAD"
    i64_extend_i32_s = b"\xAC"
    f64_convert_i32_s = b"\xB7"
    i32_trunc_f64_s = b"\xAA"
    i32_trunc_sat_f64_s = b"\xFC\x02"
    f64_add = b"\xA0"
    f64_mul = b"\xA2"
    f64_div = b"\xA3"
    f64_sqrt = b"\x9F"
    i32_extend8_s = b"\xC0"


I = _I()


class ModuleBuilder:
    """Assemble a wasm binary section by section. Indices follow the
    spec's index spaces: imported functions come before local ones."""

    def __init__(self):
        self.types: list[tuple] = []
        self.imports: list[bytes] = []
        self.n_import_funcs = 0
        self.funcs: list[tuple] = []       # (typeidx, locals, body)
        self.mem: tuple | None = None
        self.globals: list[bytes] = []
        self.exports: list[bytes] = []
        self.start: int | None = None
        self.elems: list[bytes] = []
        self.data_segs: list[bytes] = []
        self.table: tuple | None = None

    def type(self, params: list[str], results: list[str]) -> int:
        key = (tuple(params), tuple(results))
        for i, t in enumerate(self.types):
            if t == key:
                return i
        self.types.append(key)
        return len(self.types) - 1

    def import_func(self, mod: str, name: str, params: list[str],
                    results: list[str]) -> int:
        ti = self.type(params, results)
        enc = (uleb(len(mod.encode())) + mod.encode()
               + uleb(len(name.encode())) + name.encode()
               + b"\x00" + uleb(ti))
        self.imports.append(enc)
        self.n_import_funcs += 1
        return self.n_import_funcs - 1

    def func(self, params: list[str], results: list[str],
             locals_: list[str], body: bytes,
             export: str | None = None) -> int:
        ti = self.type(params, results)
        idx = self.n_import_funcs + len(self.funcs)
        self.funcs.append((ti, locals_, body))
        if export:
            self.export_func(export, idx)
        return idx

    def memory(self, min_pages: int, max_pages: int | None = None,
               export: str | None = "memory"):
        self.mem = (min_pages, max_pages)
        if export:
            self.exports.append(
                uleb(len(export.encode())) + export.encode()
                + b"\x02" + uleb(0))

    def global_(self, vt: str, mutable: bool, init: int) -> int:
        enc = (bytes((_VT[vt],)) + (b"\x01" if mutable else b"\x00"))
        if vt == "i32":
            enc += b"\x41" + sleb(init) + b"\x0B"
        elif vt == "i64":
            enc += b"\x42" + sleb(init) + b"\x0B"
        else:
            raise ValueError("only int globals supported by builder")
        self.globals.append(enc)
        return len(self.globals) - 1

    def export_func(self, name: str, idx: int):
        self.exports.append(
            uleb(len(name.encode())) + name.encode()
            + b"\x00" + uleb(idx))

    def data(self, offset: int, blob: bytes):
        self.data_segs.append(
            b"\x00" + b"\x41" + sleb(offset) + b"\x0B"
            + uleb(len(blob)) + blob)

    def funcref_table(self, entries: list[int]):
        """A funcref table populated with the given function indices
        via one active element segment at offset 0."""
        self.table = (len(entries), len(entries))
        self.elems.append(
            b"\x00" + b"\x41\x00\x0B"
            + uleb(len(entries)) + b"".join(uleb(e) for e in entries))

    def _section(self, sid: int, payload: bytes) -> bytes:
        return bytes((sid,)) + uleb(len(payload)) + payload

    def build(self) -> bytes:
        out = bytearray(b"\x00asm\x01\x00\x00\x00")
        if self.types:
            p = uleb(len(self.types))
            for params, results in self.types:
                p += (b"\x60" + uleb(len(params))
                      + bytes(_VT[t] for t in params)
                      + uleb(len(results))
                      + bytes(_VT[t] for t in results))
            out += self._section(1, p)
        if self.imports:
            out += self._section(
                2, uleb(len(self.imports)) + b"".join(self.imports))
        if self.funcs:
            out += self._section(
                3, uleb(len(self.funcs))
                + b"".join(uleb(ti) for ti, _, _ in self.funcs))
        if self.table:
            lo, hi = self.table
            out += self._section(
                4, b"\x01\x70\x01" + uleb(lo) + uleb(hi))
        if self.mem:
            lo, hi = self.mem
            enc = (b"\x01" + uleb(lo) + uleb(hi)) if hi is not None \
                else (b"\x00" + uleb(lo))
            out += self._section(5, b"\x01" + enc)
        if self.globals:
            out += self._section(
                6, uleb(len(self.globals)) + b"".join(self.globals))
        if self.exports:
            out += self._section(
                7, uleb(len(self.exports)) + b"".join(self.exports))
        if self.start is not None:
            out += self._section(8, uleb(self.start))
        if self.elems:
            out += self._section(
                9, uleb(len(self.elems)) + b"".join(self.elems))
        if self.funcs:
            bodies = []
            for _, locals_, body in self.funcs:
                if not body.endswith(b"\x0B"):
                    body += b"\x0B"
                # compress locals into (count, type) runs
                runs: list[tuple[int, str]] = []
                for lt in locals_:
                    if runs and runs[-1][1] == lt:
                        runs[-1] = (runs[-1][0] + 1, lt)
                    else:
                        runs.append((1, lt))
                ldecl = uleb(len(runs)) + b"".join(
                    uleb(c) + bytes((_VT[t],)) for c, t in runs)
                enc = ldecl + body
                bodies.append(uleb(len(enc)) + enc)
            out += self._section(
                10, uleb(len(bodies)) + b"".join(bodies))
        if self.data_segs:
            out += self._section(
                11, uleb(len(self.data_segs))
                + b"".join(self.data_segs))
        return bytes(out)


# ---------------------------------------------------------------------------
# reference-parity fixture modules
# ---------------------------------------------------------------------------

def _abi_prologue(mb: ModuleBuilder, alloc_names=("malloc", "free")):
    """Refcounted region allocator + the 4 bento_wasm imports.
    Returns the import indices dict. Heap starts at 4096 (data
    segments below). alloc bumps an 8-aligned pointer and increments a
    live counter; free/deallocate decrement it and reset the region
    when it reaches zero — so a pooled runner reusing the instance
    across thousands of messages never exhausts memory (every
    per-message allocation is released by the end of the call, either
    by the module itself or by the host's deferred free)."""
    imp = {
        "as_bytes": mb.import_func("bento_wasm", "v0_msg_as_bytes",
                                   [], ["i64"]),
        "set_bytes": mb.import_func("bento_wasm", "v0_msg_set_bytes",
                                    ["i32", "i32"], []),
        "get_meta": mb.import_func("bento_wasm", "v0_msg_get_meta",
                                   ["i32", "i32"], ["i64"]),
        "set_meta": mb.import_func("bento_wasm", "v0_msg_set_meta",
                                   ["i32", "i32", "i32", "i32"], []),
    }
    mb.memory(2, 16)
    heap = mb.global_("i32", mutable=True, init=4096)
    live = mb.global_("i32", mutable=True, init=0)
    alloc_name, free_name = alloc_names
    # alloc(n) -> ptr : live++, bump 8-aligned, memory.grow on demand
    body = b"".join([
        I.global_get(live),
        I.i32_const(1),
        I.i32_add,
        I.global_set(live),
        I.global_get(heap),
        I.local_tee(1),                      # r = heap
        I.local_get(0),
        I.i32_add,
        I.i32_const(7),
        I.i32_add,
        I.i32_const(-8),
        I.i32_and,
        I.global_set(heap),                  # heap = (r+n+7)&~7
        # grow if heap > pages*65536
        I.block(),
        I.global_get(heap),
        I.memory_size,
        I.i32_const(16),
        I.i32_shl,
        I.i32_le_u,
        I.br_if(0),
        I.global_get(heap),
        I.memory_size,
        I.i32_const(16),
        I.i32_shl,
        I.i32_sub,
        I.i32_const(65535),
        I.i32_add,
        I.i32_const(16),
        I.i32_shr_u,
        I.memory_grow,
        I.drop,
        I.end,
        I.local_get(1),
    ])
    # free/deallocate: live--; at zero, roll the whole region back
    free_body = b"".join([
        I.global_get(live),
        I.i32_const(1),
        I.i32_sub,
        I.global_set(live),
        I.global_get(live),
        I.i32_const(0),
        I.i32_le_s,
        I.if_(),
        I.i32_const(0),
        I.global_set(live),
        I.i32_const(4096),
        I.global_set(heap),
        I.end,
    ])
    if free_name == "deallocate":            # rust ABI: (ptr, size)
        mb.func(["i32", "i32"], [], [], free_body, export=free_name)
    else:
        mb.func(["i32"], [], [], free_body, export=free_name)
    mb.func(["i32"], ["i32"], ["i32"], body, export=alloc_name)
    return imp


def build_uppercase_module() -> bytes:
    """The TinyGo example (public/wasm/examples/tinygo/main.go):
    read message bytes, ASCII-uppercase in place, write back. Exports
    ``process`` + Go-style ``malloc``/``free``."""
    mb = ModuleBuilder()
    imp = _abi_prologue(mb, ("malloc", "free"))
    # locals: 0 pl(i64 via i32s) — use i64 local
    # l0: pl i64, l1 ptr, l2 len, l3 i, l4 b
    body = b"".join([
        I.call(imp["as_bytes"]),
        I.local_tee(0),
        I.i64_const(32),
        I.i64_shr_u,
        I.i32_wrap_i64,
        I.local_set(1),                      # ptr
        I.local_get(0),
        I.i32_wrap_i64,
        I.local_set(2),                      # len
        I.i32_const(0),
        I.local_set(3),
        I.block(),
        I.loop(),
        I.local_get(3),
        I.local_get(2),
        I.i32_ge_u,
        I.br_if(1),
        I.local_get(1),
        I.local_get(3),
        I.i32_add,
        I.i32_load8_u(),
        I.local_set(4),
        I.local_get(4),
        I.i32_const(97),
        I.i32_ge_u,
        I.local_get(4),
        I.i32_const(122),
        I.i32_le_u,
        I.i32_and,
        I.if_(),
        I.local_get(1),
        I.local_get(3),
        I.i32_add,
        I.local_get(4),
        I.i32_const(32),
        I.i32_sub,
        I.i32_store8(),
        I.end,
        I.local_get(3),
        I.i32_const(1),
        I.i32_add,
        I.local_set(3),
        I.br(0),
        I.end,
        I.end,
        I.local_get(1),
        I.local_get(2),
        I.call(imp["set_bytes"]),
    ])
    mb.func([], [], ["i64", "i32", "i32", "i32", "i32"], body,
            export="process")
    return mb.build()


_LOUDER_SUFFIX = b"!!!!111!!11!"


def build_louder_module() -> bytes:
    """The Rust example (louder.wasm): append ``!!!!111!!11!`` to the
    content. Exports ``process`` + Rust-style ``allocate`` /
    ``deallocate``; exercises memory.copy and a data segment."""
    mb = ModuleBuilder()
    imp = _abi_prologue(mb, ("allocate", "deallocate"))
    mb.data(256, _LOUDER_SUFFIX)
    ns = len(_LOUDER_SUFFIX)
    alloc_idx = 4 + 1                        # imports 0-3, free=4, alloc=5
    # l0 pl i64, l1 ptr, l2 len, l3 out
    body = b"".join([
        I.call(imp["as_bytes"]),
        I.local_tee(0),
        I.i64_const(32),
        I.i64_shr_u,
        I.i32_wrap_i64,
        I.local_set(1),
        I.local_get(0),
        I.i32_wrap_i64,
        I.local_set(2),
        I.local_get(2),
        I.i32_const(ns),
        I.i32_add,
        I.call(alloc_idx),
        I.local_set(3),
        I.local_get(3),                      # dst
        I.local_get(1),                      # src
        I.local_get(2),                      # n
        I.memory_copy,
        # the Rust example takes ownership of the in-bound buffer
        # (String::from_raw_parts) and drops it once copied — mirror
        # that by deallocating it here; the host never frees Rust-ABI
        # in-bound memory (processor_wazero.go:211-239 schedules only
        # goFree)
        I.local_get(1),
        I.local_get(2),
        I.call(4),                           # deallocate(ptr, len)
        I.local_get(3),
        I.local_get(2),
        I.i32_add,
        I.i32_const(256),
        I.i32_const(ns),
        I.memory_copy,
        I.local_get(3),
        I.local_get(2),
        I.i32_const(ns),
        I.i32_add,
        I.call(imp["set_bytes"]),
    ])
    mb.func([], [], ["i64", "i32", "i32", "i32"], body,
            export="process")
    return mb.build()


def build_meta_module() -> bytes:
    """Metadata round-trip fixture: copies meta key ``source`` into
    meta key ``seen_source`` and uppercases nothing — exercises
    v0_msg_get_meta / v0_msg_set_meta (functions.go:61-110)."""
    mb = ModuleBuilder()
    imp = _abi_prologue(mb)
    mb.data(128, b"source")
    mb.data(160, b"seen_source")
    # l0 pl, l1 ptr, l2 len; set_meta is (keyPtr, keyLen, valPtr, valLen)
    body = b"".join([
        I.i32_const(128),
        I.i32_const(6),
        I.call(imp["get_meta"]),
        I.local_tee(0),
        I.i64_const(32),
        I.i64_shr_u,
        I.i32_wrap_i64,
        I.local_set(1),
        I.local_get(0),
        I.i32_wrap_i64,
        I.local_set(2),
        I.i32_const(160),                    # key ptr
        I.i32_const(11),                     # key len
        I.local_get(1),                      # val ptr
        I.local_get(2),                      # val len
        I.call(imp["set_meta"]),
    ])
    mb.func([], [], ["i64", "i32", "i32"], body, export="process")
    return mb.build()
