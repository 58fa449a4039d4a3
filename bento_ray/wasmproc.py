"""The ``wasm`` processor: execute a WASM module function per message.

Reference: internal/impl/wasm/processor_wazero.go — wazero runtime,
``bento_wasm`` host module (functions.go:22-110: v0_msg_as_bytes,
v0_msg_set_bytes, v0_msg_get_meta, v0_msg_set_meta), WASI preview1,
and the dual allocation ABI: Go/TinyGo modules export ``malloc`` /
``free``, Rust modules ``allocate`` / ``deallocate``
(processor_wazero.go:135-139). In-bound buffers (host → module) are
allocated via the module's allocator; after the call the host frees
them through Go-ABI ``free`` only (:211-239 schedules goFree and
nothing else — under the Rust ABI the module takes ownership of
in-bound memory, as the Rust example's String::from_raw_parts does).
Out-bound buffers read by the host are deallocated via ``deallocate``
when present (:243-257).

Execution here runs on the from-scratch interpreter in
:mod:`bento_ray.wasmrt` (no wasm runtime exists in this sandbox); the
ABI and per-message semantics match the reference: ``process()`` is
invoked once per message with the message as the implicit target, host
-function errors flag the message and leave the batch flowing, a trap
aborts the batch (ProcessBatch error contract, :141-166)."""

from __future__ import annotations

from bento_ray.wasmrt import (
    HostFunc, Instance, WasmExit, WasmTrap, decode_module, wasi_imports,
    I32, I64,
)

__all__ = ["WasmProcessor"]


class _Runner:
    """One instantiated module: mirrors moduleRunner
    (processor_wazero.go:180-266). Reused across messages — modules
    with global state therefore see the same caveat the reference
    documents (pooled runtimes, keep modules stateless)."""

    def __init__(self, binary: bytes, function: str):
        self.target = None          # blobl.Message being processed
        self.proc_err: str | None = None
        self.after: list = []
        self.stdout = bytearray()
        self.stderr = bytearray()

        imports = dict(wasi_imports(stdout=self.stdout,
                                    stderr=self.stderr))
        imports.update({
            ("bento_wasm", "v0_msg_as_bytes"):
                HostFunc([], [I64], self._as_bytes),
            ("bento_wasm", "v0_msg_set_bytes"):
                HostFunc([I32, I32], [], self._set_bytes),
            ("bento_wasm", "v0_msg_get_meta"):
                HostFunc([I32, I32], [I64], self._get_meta),
            ("bento_wasm", "v0_msg_set_meta"):
                HostFunc([I32] * 4, [], self._set_meta),
        })
        self.inst = Instance(decode_module(binary), imports)
        # wazero's default module config invokes _start (WASI command
        # entrypoint) on instantiate; proc_exit(0) is a clean return
        start = self.inst.exports.get("_start")
        if callable(start):
            try:
                start()
            except WasmExit as e:
                if e.code != 0:
                    raise WasmTrap(f"_start exited with {e.code}")
        proc = self.inst.exports.get(function)
        if not callable(proc):
            raise ValueError(
                f"wasm module does not export function {function!r}")
        self.process = proc
        ex = self.inst.exports
        self.malloc = ex.get("malloc")
        self.free = ex.get("free")
        self.alloc_rust = ex.get("allocate")
        self.dealloc_rust = ex.get("deallocate")
        if not callable(self.malloc) and not callable(self.alloc_rust):
            raise ValueError(
                "wasm module exports neither malloc (Go ABI) nor "
                "allocate (Rust ABI)")

    # -- host functions (functions.go) -------------------------------------

    def _err(self, msg: str) -> None:
        if self.proc_err is None:
            self.proc_err = msg

    def _alloc_inbound(self, data: bytes) -> int:
        if callable(self.malloc):
            ptr = int(self.malloc(len(data)) or 0)
            self.after.append(lambda p=ptr: self.free(p)
                              if callable(self.free) else None)
        else:
            ptr = int(self.alloc_rust(len(data)) or 0)
        self.inst.write_memory(ptr, data)
        return ptr

    def _read_outbound(self, ptr: int, n: int) -> bytes:
        data = self.inst.read_memory(ptr, n)
        if callable(self.dealloc_rust):
            self.dealloc_rust(ptr, n)
        return data

    def _as_bytes(self, inst):
        if self.target is None:
            self._err("attempted to read bytes of deleted message")
            return (0,)
        try:
            data = self.target.content_bytes()
        except Exception as e:
            self._err(f"failed to get message as bytes: {e}")
            return (0,)
        ptr = self._alloc_inbound(data)
        return ((ptr << 32) | len(data),)

    def _set_bytes(self, inst, ptr, n):
        if self.target is None:
            self._err("attempted to set bytes of deleted message")
            return
        m = self.target
        m.raw = self._read_outbound(ptr, n)
        m._structured = None
        m._parsed = False

    def _get_meta(self, inst, kp, kl):
        if self.target is None:
            self._err("attempted to read meta of deleted message")
            return (0,)
        key = self._read_outbound(kp, kl).decode("utf-8")
        val = self.target.meta.get(key, "")
        data = (val if isinstance(val, str) else str(val)).encode()
        ptr = self._alloc_inbound(data)
        return ((ptr << 32) | len(data),)

    def _set_meta(self, inst, kp, kl, vp, vl):
        if self.target is None:
            self._err("attempted to set metadata of deleted message")
            return
        key = self._read_outbound(kp, kl).decode("utf-8")
        val = self._read_outbound(vp, vl).decode("utf-8")
        self.target.meta[key] = val

    # -- per-message run (moduleRunner.Run) --------------------------------

    def run_one(self, msg) -> None:
        self.target = msg
        self.proc_err = None
        self.after = []
        # per-message WASI console capture: wazero's default config
        # discards stdout/stderr; keeping only the current message's
        # output bounds the pooled runner's memory over long streams
        del self.stdout[:]
        del self.stderr[:]
        try:
            self.process()
        finally:
            for fn in self.after:
                fn()
            self.target = None
        if self.proc_err is not None:
            msg.error = self.proc_err


class WasmProcessor:
    """``wasm`` config processor (module_path + function, defaults to
    ``process``). The module is decoded once in __init__ (once per
    actor on the distributed bridge — the stateful-stage rule) and the
    runner is reused across batches, matching the reference's pool."""

    name = "wasm"

    def __init__(self, module_path: str = "", function: str = "process",
                 module_bytes: bytes | None = None):
        if module_bytes is None:
            with open(module_path, "rb") as fh:
                module_bytes = fh.read()
        self.binary = module_bytes
        self.function = function
        self._runner = _Runner(self.binary, self.function)

    def process_batch(self, batch, rt):
        out = []
        for m in batch:
            self._runner.run_one(m)
            out.append(m)
        return [out] if out else []
