"""``bento test`` — the YAML config unit-test runner.

Reference: internal/cli/test/command.go, internal/config/test/case.go:37
(case fields), output.go:30-66 (predicates). Executes the ``tests:``
block of a config file: per test, the raw config text is re-read with
that test's environment interpolated (env_vars.go), the target
processors are built (with ``mocks:`` substitutions), the input
batch(es) are pushed through, and each output message is asserted with
the predicate vocabulary (content_equals / content_matches /
json_equals / json_contains / metadata_equals / file_equals /
bloblang).
"""

from __future__ import annotations

import json
import os
import re

import yaml

from bento_ray.blobl.interp import Message
from bento_ray.blobl.parser import parse_query
from bento_ray.config.envsubst import interpolate_env
from bento_ray.config.processors import (
    MappingProcessor, Runtime, build_cache, build_processor,
    run_processors, set_config_base_dir,
)


class TestFailure(AssertionError):
    pass


def run_config_tests(path: str, only: str | None = None) -> list[dict]:
    """Run every test case for a config file. The reference convention
    (internal/cli/test/command.go): tests live either in the config's
    own ``tests:`` block or in a sibling ``<name>_bento_test.yaml``
    that contains only tests targeting the base config."""
    raw = open(path).read()
    doc = yaml.safe_load(interpolate_env(raw, {})) or {}
    tests = doc.get("tests")
    if path.endswith("_bento_test.yaml"):
        base = path[:-len("_bento_test.yaml")] + ".yaml"
        if os.path.exists(base):
            raw = open(base).read()
            path = base
    elif tests is None:
        sibling = path[:-len(".yaml")] + "_bento_test.yaml"
        if os.path.exists(sibling):
            tdoc = yaml.safe_load(open(sibling).read()) or {}
            tests = tdoc.get("tests")
    if tests is None:
        raise ValueError(f"no tests block in {path}")
    results = []
    for case in tests:
        if only and case.get("name") != only:
            continue
        _run_case(path, raw, case)
        results.append({"name": case.get("name"), "ok": True})
    return results


def _resolve_target(doc: dict, target: str, base_dir: str, env: dict):
    """target_processors path → list of processor specs."""
    if "#" in target:
        fpath, frag = target.split("#", 1)
        sub_raw = open(os.path.join(base_dir, fpath)).read()
        sub_doc = yaml.safe_load(interpolate_env(sub_raw, env)) or {}
        return _resolve_target(sub_doc, frag, os.path.dirname(
            os.path.join(base_dir, fpath)), env)
    if not target.startswith("/"):
        # bare label: search pipeline + processor_resources
        for spec in (doc.get("pipeline", {}) or {}).get(
                "processors", []) or []:
            if spec.get("label") == target:
                return [spec]
        for spec in doc.get("processor_resources", []) or []:
            if spec.get("label") == target:
                return [spec]
        raise ValueError(f"target {target!r} not found")
    parts = [p for p in target.split("/") if p]
    if parts[0] == "pipeline":
        specs = (doc.get("pipeline", {}) or {}).get("processors", []) or []
        parts = parts[2:] if len(parts) > 1 else []
    elif parts[0] == "processor_resources":
        specs = doc.get("processor_resources", []) or []
        parts = parts[1:]
    else:
        raise ValueError(f"unsupported target path {target!r}")
    if parts:
        return [specs[int(parts[0])]]
    return list(specs)


def _json_pointer_set(doc: dict, pointer: str, value) -> None:
    parts = [p for p in pointer.split("/") if p]
    cur = doc
    for p in parts[:-1]:
        if isinstance(cur, list):
            cur = cur[int(p)]
        else:
            cur = cur[p]
    last = parts[-1]
    if last == "-":
        cur.append(value)
    elif isinstance(cur, list):
        cur[int(last)] = value
    else:
        cur[last] = value


def _apply_mocks(doc: dict, mocks: dict) -> None:
    for key, repl in (mocks or {}).items():
        if key.startswith("/"):
            _json_pointer_set(doc, key, repl)
            continue
        # label search-and-replace anywhere in pipeline/resources
        replaced = False
        for section in ("pipeline", ):
            specs = (doc.get(section, {}) or {}).get("processors", []) or []
            for i, spec in enumerate(specs):
                if spec.get("label") == key:
                    # keep the label so label-targeted tests
                    # (target_processors: <label>) still resolve
                    specs[i] = {**repl, "label": key}
                    replaced = True
        for i, spec in enumerate(doc.get("processor_resources", []) or []):
            if spec.get("label") == key:
                lbl = spec.get("label")
                doc["processor_resources"][i] = {**repl, "label": lbl}
                replaced = True
        if not replaced:
            raise ValueError(f"mock target {key!r} not found")


def _build_messages(batch_spec: list, base_dir: str) -> list[Message]:
    out = []
    for m in batch_spec or []:
        meta = m.get("metadata") or {}
        if "json_content" in m:
            msg = Message.from_content(m["json_content"], meta=meta)
        elif "file_content" in m:
            raw = open(os.path.join(base_dir, m["file_content"]),
                       "rb").read()
            msg = Message.from_content(raw, meta=meta)
        else:
            msg = Message.from_content(m.get("content", ""), meta=meta)
        out.append(msg)
    return out


def _run_case(path: str, raw: str, case: dict) -> None:
    base_dir = os.path.dirname(os.path.abspath(path))
    set_config_base_dir(base_dir)
    env = {str(k): str(v) for k, v in (case.get("environment") or {}).items()}
    doc = yaml.safe_load(interpolate_env(raw, env)) or {}
    name = case.get("name", "<unnamed>")

    _apply_mocks(doc, case.get("mocks"))

    # resources (two passes: multilevel refers to earlier labels)
    caches: dict = {}
    deferred = []
    for spec in doc.get("cache_resources", []) or []:
        spec = dict(spec)
        label = spec.pop("label")
        if "multilevel" in spec:
            deferred.append((label, spec))
        else:
            caches[label] = build_cache(spec)
    for label, spec in deferred:
        caches[label] = build_cache(spec, resources=caches)
    proc_resources = {}
    for spec in doc.get("processor_resources", []) or []:
        s = dict(spec)
        lbl = s.get("label")
        proc_resources[lbl] = build_processor(spec)

    # target
    if case.get("target_mapping"):
        src = open(os.path.join(base_dir, case["target_mapping"])).read()
        procs = [MappingProcessor(interpolate_env(src, env))]
    else:
        target = case.get("target_processors", "/pipeline/processors")
        specs = _resolve_target(doc, target, base_dir, env)
        procs = [build_processor(s, proc_resources) for s in specs]

    rt = Runtime(env=env, caches=caches)

    # inputs: batches processed sequentially through the same chain
    in_batches = case.get("input_batches")
    if in_batches is None:
        in_batches = [case.get("input_batch", [])]
    out_batches: list[list[Message]] = []
    for bspec in in_batches:
        out_batches.extend(
            run_processors(procs, [_build_messages(bspec, base_dir)], rt))

    want_batches = case.get("output_batches", [])
    if len(out_batches) != len(want_batches):
        raise TestFailure(
            f"{path}::{name}: expected {len(want_batches)} output "
            f"batches, got {len(out_batches)} "
            f"({[[m.content_bytes() for m in b] for b in out_batches]})")
    for bi, (got, want) in enumerate(zip(out_batches, want_batches)):
        if len(got) != len(want):
            raise TestFailure(
                f"{path}::{name}: batch {bi}: expected {len(want)} "
                f"messages, got {len(got)}: "
                f"{[m.content_bytes() for m in got]}")
        for mi, (msg, preds) in enumerate(zip(got, want)):
            _assert_predicates(msg, preds, base_dir,
                               f"{path}::{name}: batch {bi} msg {mi}")


def _assert_predicates(msg: Message, preds: dict, base_dir: str,
                       where: str) -> None:
    for pname, want in (preds or {}).items():
        got_s = msg.content_bytes().decode("utf-8", "replace")
        if pname == "content_equals":
            want_s = want if isinstance(want, str) else \
                json.dumps(want) if isinstance(want, (dict, list)) else \
                str(want).lower() if isinstance(want, bool) else str(want)
            if got_s.rstrip("\n") != str(want_s).rstrip("\n"):
                raise TestFailure(
                    f"{where}: content_equals {want_s!r} != {got_s!r}")
        elif pname == "content_matches":
            if not re.search(str(want), got_s):
                raise TestFailure(
                    f"{where}: content_matches {want!r} !~ {got_s!r}")
        elif pname == "json_equals":
            got = json.loads(got_s)
            if isinstance(want, str):
                want = json.loads(want)
            if got != want:
                raise TestFailure(
                    f"{where}: json_equals {want!r} != {got!r}")
        elif pname == "json_contains":
            got = json.loads(got_s)
            if not _contains(want, got):
                raise TestFailure(
                    f"{where}: json_contains {want!r} ⊄ {got!r}")
        elif pname == "metadata_equals":
            for k, v in (want or {}).items():
                gv = msg.meta.get(k)
                if gv != v and str(gv) != str(v):
                    raise TestFailure(
                        f"{where}: metadata[{k}] {v!r} != {gv!r}")
        elif pname == "file_equals":
            fb = open(os.path.join(base_dir, want), "rb").read()
            if msg.content_bytes().rstrip(b"\n") != fb.rstrip(b"\n"):
                raise TestFailure(
                    f"{where}: file_equals {want}: {fb!r} != "
                    f"{msg.content_bytes()!r}")
        elif pname == "file_json_equals":
            fb = json.load(open(os.path.join(base_dir, want)))
            if json.loads(got_s) != fb:
                raise TestFailure(f"{where}: file_json_equals {want}")
        elif pname == "bloblang":
            from bento_ray.blobl.interp import (
                Context, _LazyThis, eval_query,
            )
            from bento_ray.blobl.values import NOTHING

            ctx = Context(stack=(_LazyThis(msg.structured),), named={},
                          vars={}, meta=dict(msg.meta), root_ref=[NOTHING],
                          index=0, batch=[msg], maps={}, env={},
                          counters={}, legacy={"error": msg.error})
            res = eval_query(parse_query(str(want)), ctx)
            if res is not True:
                raise TestFailure(
                    f"{where}: bloblang predicate {want!r} → {res!r}")
        else:
            raise ValueError(f"unsupported predicate {pname!r}")


def _contains(sub, sup) -> bool:
    if isinstance(sub, dict):
        return isinstance(sup, dict) and all(
            k in sup and _contains(v, sup[k]) for k, v in sub.items())
    if isinstance(sub, list):
        return isinstance(sup, list) and len(sub) == len(sup) and all(
            _contains(a, b) for a, b in zip(sub, sup))
    return sub == sup
