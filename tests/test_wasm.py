"""``wasm`` processor + the from-scratch WebAssembly interpreter.

Processor shapes mirror internal/impl/wasm/processor_wazero_test.go
(uppercase = the TinyGo example with Go malloc/free ABI, louder = the
Rust example with allocate/deallocate ABI and the exact
``!!!!111!!11!`` suffix); the interpreter tests cover the core-spec
behaviors the fixtures rely on plus trap/edge semantics the fixtures
don't reach (div-by-zero, OOB, br_table, call_indirect, saturating
truncation, memory.grow limits, sign extension).
"""

import math
import struct

import pytest

from bento_ray.blobl.interp import Message
from bento_ray.config.processors import Runtime, build_processor
from bento_ray.wasmbuild import (I, ModuleBuilder, build_louder_module,
                                 build_meta_module,
                                 build_uppercase_module)
from bento_ray.wasmproc import WasmProcessor
from bento_ray.wasmrt import (HostFunc, Instance, WasmTrap,
                              decode_module, wasi_imports, I32, I64)


def _inst(mb: ModuleBuilder, imports=None) -> Instance:
    return Instance(decode_module(mb.build()), imports or {})


def _func_module(params, results, locals_, body) -> Instance:
    mb = ModuleBuilder()
    mb.func(params, results, locals_, body, export="f")
    return _inst(mb)


# ------------------------------------------------------ interpreter core

def test_i32_arith_and_compare():
    inst = _func_module(
        ["i32", "i32"], ["i32"], [],
        I.local_get(0) + I.local_get(1) + I.i32_add
        + I.local_get(0) + I.local_get(1) + I.i32_mul + I.i32_add)
    assert inst.exports["f"](3, 4) == 3 + 4 + 12
    # wrap-around
    assert inst.exports["f"](0xFFFFFFFF, 1) == (0xFFFFFFFF + 1
                                                + 0xFFFFFFFF) & 0xFFFFFFFF


def test_signed_division_semantics():
    inst = _func_module(["i32", "i32"], ["i32"], [],
                        I.local_get(0) + I.local_get(1) + I.i32_div_s)
    f = inst.exports["f"]
    assert f(7, 2) == 3
    assert f((-7) & 0xFFFFFFFF, 2) == (-3) & 0xFFFFFFFF   # trunc toward 0
    with pytest.raises(WasmTrap, match="divide by zero"):
        f(1, 0)
    with pytest.raises(WasmTrap, match="overflow"):
        f(0x80000000, 0xFFFFFFFF)                         # INT_MIN / -1


def test_rem_s_sign_follows_dividend():
    inst = _func_module(["i32", "i32"], ["i32"], [],
                        I.local_get(0) + I.local_get(1) + I.i32_rem_s)
    assert inst.exports["f"]((-7) & 0xFFFFFFFF, 3) == (-1) & 0xFFFFFFFF
    assert inst.exports["f"](7, (-3) & 0xFFFFFFFF) == 1


def test_loop_factorial_i64():
    # fact(n): loop with br_if — the canonical structured-control test
    body = b"".join([
        I.i64_const(1), I.local_set(1),
        I.block(), I.loop(),
        I.local_get(0), I.i64_const(1), I.i64_lt_u, I.br_if(1),
        I.local_get(1), I.local_get(0), I.i64_mul, I.local_set(1),
        I.local_get(0), I.i64_const(1), I.i64_sub, I.local_set(0),
        I.br(0),
        I.end, I.end,
        I.local_get(1),
    ])
    inst = _func_module(["i64"], ["i64"], ["i64"], body)
    assert inst.exports["f"](20) == math.factorial(20)


def test_if_else_and_block_results():
    # abs via if/else with an i32 result block type
    body = b"".join([
        I.local_get(0), I.i32_const(0), I.i32_lt_s,
        I.if_(0x7F),
        I.i32_const(0), I.local_get(0), I.i32_sub,
        I.else_,
        I.local_get(0),
        I.end,
    ])
    inst = _func_module(["i32"], ["i32"], [], body)
    assert inst.exports["f"]((-5) & 0xFFFFFFFF) == 5
    assert inst.exports["f"](9) == 9


def test_br_table():
    # switch(i): 0→10, 1→20, default→99
    body = b"".join([
        I.block(), I.block(), I.block(),
        I.local_get(0),
        I.br_table([0, 1], 2),
        I.end,
        I.i32_const(10), I.ret,
        I.end,
        I.i32_const(20), I.ret,
        I.end,
        I.i32_const(99),
    ])
    inst = _func_module(["i32"], ["i32"], [], body)
    assert inst.exports["f"](0) == 10
    assert inst.exports["f"](1) == 20
    assert inst.exports["f"](7) == 99


def test_call_indirect_dispatch_and_type_check():
    mb = ModuleBuilder()
    add = mb.func(["i32", "i32"], ["i32"], [],
                  I.local_get(0) + I.local_get(1) + I.i32_add)
    sub = mb.func(["i32", "i32"], ["i32"], [],
                  I.local_get(0) + I.local_get(1) + I.i32_sub)
    noargs = mb.func([], ["i32"], [], I.i32_const(42))
    ti = mb.type(["i32"], ["i32"])  # wrong signature for the table fns
    ti2 = mb.type(["i32", "i32"], ["i32"])
    mb.funcref_table([add, sub, noargs])
    mb.func(["i32", "i32", "i32"], ["i32"], [],
            I.local_get(1) + I.local_get(2) + I.local_get(0)
            + I.call_indirect(ti2), export="dispatch")
    mb.func(["i32"], ["i32"], [],
            I.local_get(0) + I.i32_const(2) + I.call_indirect(ti),
            export="bad")
    inst = _inst(mb)
    assert inst.exports["dispatch"](0, 30, 12) == 42
    assert inst.exports["dispatch"](1, 30, 12) == 18
    with pytest.raises(WasmTrap, match="type mismatch"):
        inst.exports["bad"](1)


def test_memory_load_store_and_data_segment():
    mb = ModuleBuilder()
    mb.memory(1)
    mb.data(16, struct.pack("<I", 0xDEADBEEF))
    mb.func(["i32"], ["i32"], [], I.local_get(0) + I.i32_load(),
            export="peek32")
    mb.func(["i32", "i32"], [], [],
            I.local_get(0) + I.local_get(1) + I.i32_store(),
            export="poke32")
    mb.func(["i32"], ["i32"], [], I.local_get(0) + I.i32_load8_s(),
            export="peek8s")
    inst = _inst(mb)
    assert inst.exports["peek32"](16) == 0xDEADBEEF
    inst.exports["poke32"](100, 0x01020384)
    assert inst.exports["peek32"](100) == 0x01020384
    assert inst.exports["peek8s"](103) == 1
    # 0x84 sign-extends negative through load8_s
    assert inst.exports["peek8s"](100) == 0x84 - 256 + (1 << 32)


def test_memory_oob_traps():
    mb = ModuleBuilder()
    mb.memory(1, 1)
    mb.func(["i32"], ["i32"], [], I.local_get(0) + I.i32_load(),
            export="peek")
    inst = _inst(mb)
    with pytest.raises(WasmTrap, match="out of bounds"):
        inst.exports["peek"](65536 - 3)


def test_memory_grow_and_size():
    mb = ModuleBuilder()
    mb.memory(1, 4)
    mb.func(["i32"], ["i32"], [],
            I.local_get(0) + I.memory_grow, export="grow")
    mb.func([], ["i32"], [], I.memory_size, export="size")
    inst = _inst(mb)
    assert inst.exports["size"]() == 1
    assert inst.exports["grow"](2) == 1      # returns former size
    assert inst.exports["size"]() == 3
    assert inst.exports["grow"](5) == 0xFFFFFFFF   # over max → -1
    assert inst.exports["size"]() == 3


def test_globals_mutate_across_calls():
    mb = ModuleBuilder()
    g = mb.global_("i64", mutable=True, init=7)
    mb.func([], ["i64"], [],
            I.global_get(g) + I.i64_const(1) + I.i64_add
            + I.global_set(g) + I.global_get(g), export="bump")
    inst = _inst(mb)
    assert inst.exports["bump"]() == 8
    assert inst.exports["bump"]() == 9


def test_f64_numerics_and_trunc_sat():
    mb = ModuleBuilder()
    mb.func(["f64", "f64"], ["f64"], [],
            I.local_get(0) + I.local_get(1) + I.f64_div,
            export="div")
    mb.func(["f64"], ["i32"], [],
            I.local_get(0) + I.i32_trunc_sat_f64_s, export="sat")
    mb.func(["f64"], ["i32"], [],
            I.local_get(0) + I.i32_trunc_f64_s, export="trunc")
    inst = _inst(mb)
    assert inst.exports["div"](1.0, 8.0) == 0.125
    assert math.isinf(inst.exports["div"](1.0, 0.0))
    assert inst.exports["sat"](1e300) == 0x7FFFFFFF
    assert inst.exports["sat"](float("nan")) == 0
    assert inst.exports["sat"](-1e300) == 0x80000000
    with pytest.raises(WasmTrap, match="overflow"):
        inst.exports["trunc"](1e300)
    with pytest.raises(WasmTrap, match="invalid conversion"):
        inst.exports["trunc"](float("nan"))


def test_sign_extension_ops():
    inst = _func_module(["i32"], ["i32"], [],
                        I.local_get(0) + I.i32_extend8_s)
    assert inst.exports["f"](0x80) == 0xFFFFFF80
    assert inst.exports["f"](0x7F) == 0x7F


def test_unreachable_traps():
    inst = _func_module([], [], [], I.unreachable)
    with pytest.raises(WasmTrap, match="unreachable"):
        inst.exports["f"]()


def test_host_function_roundtrip():
    mb = ModuleBuilder()
    hidx = mb.import_func("env", "triple", ["i32"], ["i32"])
    mb.func(["i32"], ["i32"], [],
            I.local_get(0) + I.call(hidx) + I.i32_const(1) + I.i32_add,
            export="f")
    inst = _inst(mb, {("env", "triple"):
                      HostFunc([I32], [I32],
                               lambda inst, v: (v * 3 & 0xFFFFFFFF,))})
    assert inst.exports["f"](5) == 16


def test_unresolved_import_fails():
    mb = ModuleBuilder()
    mb.import_func("env", "missing", [], [])
    mb.func([], [], [], I.nop, export="f")
    with pytest.raises(WasmTrap, match="unresolved"):
        _inst(mb)


def test_wasi_fd_write():
    # iovec at 0: base=64 len=5; "hello" at 64 → fd 1
    mb = ModuleBuilder()
    fd_write = mb.import_func("wasi_snapshot_preview1", "fd_write",
                              ["i32", "i32", "i32", "i32"], ["i32"])
    mb.memory(1)
    mb.data(64, b"hello")
    mb.func([], ["i32"], [],
            I.i32_const(0) + I.i32_const(64) + I.i32_store()
            + I.i32_const(4) + I.i32_const(5) + I.i32_store()
            + I.i32_const(1) + I.i32_const(0) + I.i32_const(1)
            + I.i32_const(32) + I.call(fd_write), export="say")
    out = bytearray()
    inst = _inst(mb, wasi_imports(stdout=out))
    assert inst.exports["say"]() == 0
    assert bytes(out) == b"hello"
    assert inst.read_memory(32, 4) == struct.pack("<I", 5)


# ------------------------------------------------------ processor parity

def _rt():
    return Runtime()


def test_wasm_processor_uppercase_go_abi(tmp_path):
    """processor_wazero_test.go:20 TestWazeroWASIGoProcessor."""
    p = tmp_path / "uppercase.wasm"
    p.write_bytes(build_uppercase_module())
    proc = build_processor({"wasm": {"module_path": str(p)}})
    for i in range(50):
        batch = [Message.from_content(b"hello world")]
        out = proc.process_batch(batch, _rt())
        assert len(out) == 1 and len(out[0]) == 1
        assert out[0][0].content_bytes() == b"HELLO WORLD"
        assert not out[0][0].error


def test_wasm_processor_louder_rust_abi(tmp_path):
    """processor_wazero_test.go:86 TestWazeroWASIRustProcessor —
    exact expected suffix."""
    p = tmp_path / "louder.wasm"
    p.write_bytes(build_louder_module())
    proc = WasmProcessor(module_path=str(p))
    for i in range(50):
        batch = [Message.from_content(b"hello world")]
        out = proc.process_batch(batch, _rt())
        assert out[0][0].content_bytes() == b"hello world!!!!111!!11!"


def test_wasm_processor_meta_roundtrip():
    proc = WasmProcessor(module_bytes=build_meta_module())
    m = Message.from_content(b"x")
    m.meta["source"] = "kafka-7"
    proc.process_batch([m], _rt())
    assert m.meta["seen_source"] == "kafka-7"
    assert m.content_bytes() == b"x"


def test_wasm_processor_batch_of_messages():
    proc = WasmProcessor(module_bytes=build_uppercase_module())
    batch = [Message.from_content(s)
             for s in (b"one", b"Two", b"TH33 x")]
    out = proc.process_batch(batch, _rt())
    assert [m.content_bytes() for m in out[0]] == \
        [b"ONE", b"TWO", b"TH33 X"]


def test_wasm_processor_missing_function():
    with pytest.raises(ValueError, match="does not export"):
        WasmProcessor(module_bytes=build_uppercase_module(),
                      function="nope")


def test_wasm_processor_custom_function_name(tmp_path):
    mb = ModuleBuilder()
    from bento_ray.wasmbuild import _abi_prologue

    imp = _abi_prologue(mb)
    body = b"".join([
        I.call(imp["as_bytes"]),
        I.local_tee(0),
        I.i64_const(32), I.i64_shr_u, I.i32_wrap_i64,
        I.local_get(0), I.i32_wrap_i64,
        I.call(imp["set_bytes"]),
    ])
    mb.func([], [], ["i64"], body, export="noop_copy")
    proc = WasmProcessor(module_bytes=mb.build(), function="noop_copy")
    m = Message.from_content(b"payload")
    proc.process_batch([m], _rt())
    assert m.content_bytes() == b"payload"


# --------------------------------------------- differential property test

from hypothesis import given, settings
from hypothesis import strategies as st

_I32_BINOPS = {
    "add": (I.i32_add, lambda a, b: (a + b) & 0xFFFFFFFF),
    "sub": (I.i32_sub, lambda a, b: (a - b) & 0xFFFFFFFF),
    "mul": (I.i32_mul, lambda a, b: (a * b) & 0xFFFFFFFF),
    "and": (I.i32_and, lambda a, b: a & b),
    "or": (I.i32_or, lambda a, b: a | b),
    "xor": (I.i32_xor, lambda a, b: a ^ b),
    "shl": (I.i32_shl, lambda a, b: (a << (b % 32)) & 0xFFFFFFFF),
    "shr_u": (I.i32_shr_u, lambda a, b: a >> (b % 32)),
    "rotl": (I.i32_rotl,
             lambda a, b: ((a << (b % 32)) | (a >> (32 - b % 32)))
             & 0xFFFFFFFF if b % 32 else a),
    "div_u": (I.i32_div_u, lambda a, b: a // b if b else None),
    "rem_u": (I.i32_rem_u, lambda a, b: a % b if b else None),
}


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(sorted(_I32_BINOPS)),
                          st.integers(0, 0xFFFFFFFF)),
                min_size=1, max_size=12),
       st.integers(0, 0xFFFFFFFF))
def test_i32_binop_chains_match_python(opseq, seed):
    """Differential check: a random chain of i32 binops computed by
    the interpreter equals the masked-Python evaluation, trapping
    exactly when Python hits the div/rem-by-zero case."""
    body = I.local_get(0)
    expect = seed
    trap = False
    for name, operand in opseq:
        enc, py = _I32_BINOPS[name]
        body += I.i32_const(operand if operand < 0x80000000
                            else operand - (1 << 32)) + enc
        if not trap:
            nxt = py(expect, operand)
            if nxt is None:
                trap = True
            else:
                expect = nxt
    inst = _func_module(["i32"], ["i32"], [], body)
    if trap:
        with pytest.raises(WasmTrap):
            inst.exports["f"](seed)
    else:
        assert inst.exports["f"](seed) == expect


@settings(max_examples=40, deadline=None)
@given(st.integers(-(1 << 63), (1 << 63) - 1),
       st.integers(-(1 << 63), (1 << 63) - 1))
def test_i64_signed_compare_matrix(a, b):
    au, bu = a & ((1 << 64) - 1), b & ((1 << 64) - 1)
    mb = ModuleBuilder()
    mb.func(["i64", "i64"], ["i32"], [],
            I.local_get(0) + I.local_get(1) + b"\x53", export="lt_s")
    mb.func(["i64", "i64"], ["i32"], [],
            I.local_get(0) + I.local_get(1) + b"\x57", export="le_s")
    mb.func(["i64", "i64"], ["i32"], [],
            I.local_get(0) + I.local_get(1) + b"\x55", export="gt_s")
    inst = _inst(mb)
    assert inst.exports["lt_s"](au, bu) == int(a < b)
    assert inst.exports["le_s"](au, bu) == int(a <= b)
    assert inst.exports["gt_s"](au, bu) == int(a > b)


def test_from_yaml_wasm_bridge(tmp_path):
    """A YAML pipeline naming the wasm processor compiles into the
    distributed config bridge (actor-pool map_batches; module decoded
    once per actor) — the reference's `wasm:` config surface
    end-to-end."""
    from bento_ray.pipelines.builder import Pipeline

    mod = tmp_path / "uppercase.wasm"
    mod.write_bytes(build_uppercase_module())
    p = Pipeline.from_yaml(f"""
input:
  generate:
    count: 4
    mapping: 'root = "hello world " + counter().string()'
pipeline:
  processors:
    - wasm:
        module_path: {mod}
""")
    df = p.to_pandas()
    col = [c for c in df.columns if c != "err"][0]
    vals = sorted(df[col].tolist())
    assert vals == [f"HELLO WORLD {i}" for i in range(1, 5)]


# ------------------------------------------- review-finding regressions

def test_pooled_runner_heap_is_stable_over_many_large_messages():
    """The fixtures' region allocator resets when the live count hits
    zero, so a pooled runner must survive far more cumulative bytes
    than its 16-page memory cap (the old pure-bump fixture trapped
    after ~1 MiB)."""
    big = b"a" * 4096
    for build in (build_uppercase_module, build_louder_module):
        proc = WasmProcessor(module_bytes=build())
        pages0 = proc._runner.inst.mem_pages
        for _ in range(600):                 # ~2.4 MiB cumulative
            m = Message.from_content(big)
            proc.process_batch([m], _rt())
            assert not m.error
        assert proc._runner.inst.mem_pages == pages0


def test_f32_overflow_rounds_to_inf():
    mb = ModuleBuilder()
    mb.func(["f32", "f32"], ["f32"], [],
            I.local_get(0) + I.local_get(1) + b"\x92",  # f32.add
            export="add")
    inst = _inst(mb)
    assert math.isinf(inst.exports["add"](3e38, 3e38))


def test_float_div_nan_by_zero_is_nan():
    mb = ModuleBuilder()
    mb.func(["f64", "f64"], ["f64"], [],
            I.local_get(0) + I.local_get(1) + I.f64_div, export="d64")
    mb.func(["f32", "f32"], ["f32"], [],
            I.local_get(0) + I.local_get(1) + b"\x95", export="d32")
    inst = _inst(mb)
    assert math.isnan(inst.exports["d64"](float("nan"), 0.0))
    assert math.isnan(inst.exports["d32"](float("nan"), 0.0))


def test_wasi_fd_write_bad_fd_returns_ebadf():
    mb = ModuleBuilder()
    fd_write = mb.import_func("wasi_snapshot_preview1", "fd_write",
                              ["i32", "i32", "i32", "i32"], ["i32"])
    mb.memory(1)
    mb.func(["i32"], ["i32"], [],
            I.local_get(0) + I.i32_const(0) + I.i32_const(0)
            + I.i32_const(32) + I.call(fd_write), export="w")
    inst = _inst(mb, wasi_imports())
    assert inst.exports["w"](5) == 8         # EBADF
    assert inst.exports["w"](0) == 8
    assert inst.exports["w"](1) == 0


def test_runner_console_capture_is_per_message():
    proc = WasmProcessor(module_bytes=build_uppercase_module())
    r = proc._runner
    r.stdout.extend(b"stale output from a previous message")
    m = Message.from_content(b"x")
    proc.process_batch([m], _rt())
    assert bytes(r.stdout) == b""            # drained at run start


def test_empty_batch_through_processor():
    proc = WasmProcessor(module_bytes=build_uppercase_module())
    assert proc.process_batch([], _rt()) == []


def test_multivalue_block_and_loop_params():
    """Multi-value extension: a block with a function-type signature
    returns two values through br; a loop with params receives them on
    each back-edge (the shapes modern toolchains emit)."""
    from bento_ray.wasmbuild import sleb

    mb = ModuleBuilder()
    ti = mb.type(["i32", "i32"], ["i32", "i32"])
    mb.func(["i32", "i32"], ["i32", "i32"], [],
            I.local_get(1) + I.local_get(0)
            + b"\x02" + sleb(ti) + I.br(0) + I.end,
            export="swap")
    ti2 = mb.type(["i32", "i32"], ["i32"])
    mb.func(["i32"], ["i32"], ["i32", "i32"],
            I.i32_const(0) + I.local_get(0)
            + b"\x03" + sleb(ti2)
            + I.local_set(1) + I.local_set(2)
            + I.local_get(1) + I.i32_eqz
            + I.if_(0x7F)
            + I.local_get(2)
            + I.else_
            + I.local_get(2) + I.local_get(1) + I.i32_add
            + I.local_get(1) + I.i32_const(1) + I.i32_sub
            + I.br(1)
            + I.end + I.end,
            export="gauss")
    inst = _inst(mb)
    assert inst.exports["swap"](3, 9) == (9, 3)
    assert inst.exports["gauss"](100) == 5050
