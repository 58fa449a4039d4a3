"""Runnable tour of the wasm processor. Usage:

    cd /root/repo && python examples/wasm_demo.py

Builds the reference's TinyGo `uppercase` example module from raw
bytecode (bento_ray.wasmbuild — no wasm toolchain in this sandbox),
runs it per message on the from-scratch interpreter through three
surfaces: the processor API, a YAML config pipeline (the `wasm:` kind
compiles into the distributed actor-pool bridge), and the oracled
distributed query over the documents table.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from bento_ray.blobl.interp import Message
    from bento_ray.config.processors import Runtime
    from bento_ray.wasmbuild import build_louder_module, build_uppercase_module
    from bento_ray.wasmproc import WasmProcessor

    # 1. the processor API — one module instance per actor, one
    #    process() call per message (processor_wazero.go semantics)
    print("== processor API ==")
    proc = WasmProcessor(module_bytes=build_uppercase_module())
    msg = Message.from_content(b"hello world")
    proc.process_batch([msg], Runtime())
    print("uppercase.wasm:", msg.content_bytes())

    rust = WasmProcessor(module_bytes=build_louder_module())
    msg = Message.from_content(b"hello world")
    rust.process_batch([msg], Runtime())
    print("louder.wasm  :", msg.content_bytes())

    # 2. the YAML config surface — `wasm:` routes through the
    #    distributed config bridge
    print("== YAML pipeline ==")
    from bento_ray.pipelines.builder import Pipeline

    with tempfile.TemporaryDirectory() as d:
        mod = os.path.join(d, "uppercase.wasm")
        with open(mod, "wb") as fh:
            fh.write(build_uppercase_module())
        p = Pipeline.from_yaml(f"""
input:
  generate:
    count: 3
    mapping: 'root = "message number " + counter().string()'
pipeline:
  processors:
    - wasm:
        module_path: {mod}
""")
        for row in p.to_pandas().itertuples(index=False):
            print(" ", row[0])

    # 3. the oracled distributed query (q_wasm_uppercase)
    print("== distributed query ==")
    from bento_ray.pipelines.queries import QUERIES

    out = QUERIES["q_wasm_uppercase"][0](SF).to_pandas()
    print(out.head(3).to_string(index=False, max_colwidth=48))
    print(f"({len(out)} documents uppercased through the interpreter)")

    ray.shutdown()


if __name__ == "__main__":
    main()
