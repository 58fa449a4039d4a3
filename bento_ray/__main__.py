"""CLI — the ``bento`` command surface re-expressed for Ray Data.

Reference: internal/cli/run.go (run / test / lint / blobl / echo
subcommands).

  python -m bento_ray run config.yaml [--output out.parquet]
  python -m bento_ray test  path [path...]      # config unit tests
  python -m bento_ray lint  config.yaml [...]
  python -m bento_ray blobl 'root.x = this.y'   # mapping over stdin
  python -m bento_ray echo  config.yaml         # parsed + env-resolved

Owns its own Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _cmd_run(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import yaml

    from bento_ray.config.envsubst import interpolate_env
    from bento_ray.pipelines.builder import Pipeline

    p = Pipeline.from_yaml(args.config)
    doc = yaml.safe_load(interpolate_env(
        open(args.config).read(), os.environ)) or {}
    out_spec = doc.get("output") or {}
    if args.output:
        p.write_parquet(args.output)
        print(f"wrote {args.output}")
    elif "parquet" in out_spec or "file" in out_spec:
        cfg = out_spec.get("parquet") or out_spec.get("file") or {}
        path = cfg.get("path") if isinstance(cfg, dict) else cfg
        p.write_parquet(path)
        print(f"wrote {path}")
    elif "stdout" in out_spec:
        for row in p.dataset().iter_rows():
            # content-mode rows print the message bytes per line
            # (output_stdout.go); structured rows print as JSON docs
            if "content" in row and set(row) <= {"content", "err",
                                                 "path"}:
                c = row["content"]
                if isinstance(c, (bytes, bytearray)):
                    c = c.decode("utf-8", "replace")
                print(c)
            else:
                print(json.dumps(row, default=str, sort_keys=True,
                                 separators=(",", ":")))
    elif "drop" in out_spec:
        print(f"{p.drop()} rows dropped")
    else:
        n = p.dataset().count()
        print(f"{n} rows")
    ray.shutdown()
    return 0


def _cmd_test(args) -> int:
    from bento_ray.config.testrunner import TestFailure, run_config_tests

    files: list[str] = []
    for pat in args.paths:
        if os.path.isdir(pat):
            files.extend(sorted(glob.glob(os.path.join(pat, "*.yaml"))))
        else:
            files.extend(sorted(glob.glob(pat)) or [pat])
    total = failed = 0
    for f in files:
        try:
            results = run_config_tests(f)
        except ValueError:
            continue  # no tests block
        except TestFailure as e:
            print(f"FAIL {f}: {e}")
            failed += 1
            continue
        total += len(results)
        for r in results:
            print(f"ok   {f} :: {r['name']}")
    print(f"{total} cases passed, {failed} failed")
    return 1 if failed else 0


def _lint_config(doc: dict, path: str) -> list[str]:
    """Structural lint (internal/config/lint.go:100 analog): unknown
    processor kinds, missing required fields, dangling resource refs."""
    from bento_ray.config.processors import build_processor

    problems: list[str] = []
    cache_labels = {c.get("label")
                    for c in doc.get("cache_resources", []) or []}
    proc_resources = {}
    for spec in doc.get("processor_resources", []) or []:
        try:
            proc_resources[spec.get("label")] = build_processor(spec)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{path}: processor_resources"
                            f"[{spec.get('label')}]: {e}")
    steps = (doc.get("pipeline") or {})
    if isinstance(steps, dict):
        steps = steps.get("processors", []) or []
    for i, spec in enumerate(steps):
        try:
            proc = build_processor(spec, proc_resources)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{path}: processors[{i}]: {e}")
            continue
        if proc.name == "dedupe" and \
                proc.cache_name not in cache_labels:
            problems.append(
                f"{path}: processors[{i}]: dedupe references unknown "
                f"cache {proc.cache_name!r}")
    return problems


def _cmd_lint(args) -> int:
    import yaml

    from bento_ray.config.envsubst import interpolate_env

    bad = 0
    for f in args.configs:
        try:
            doc = yaml.safe_load(
                interpolate_env(open(f).read(), os.environ)) or {}
        except Exception as e:  # noqa: BLE001
            print(f"{f}: invalid YAML: {e}")
            bad += 1
            continue
        problems = _lint_config(doc, f)
        for p in problems:
            print(p)
        bad += len(problems)
    if bad == 0:
        print("no linting errors")
    return 1 if bad else 0


def _cmd_blobl(args) -> int:
    """Execute a mapping over stdin lines (one message per line) —
    the ``bento blobl`` REPL contract."""
    from bento_ray.blobl.interp import Mapping, Message

    m = Mapping(args.mapping)
    status = 0
    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line:
            continue
        out = m.run_batch([Message.from_content(line)], on_error="mark")
        for msg in out:
            if msg.error:
                print(f"Error: {msg.error}", file=sys.stderr)
                status = 1
            else:
                sys.stdout.write(
                    msg.content_bytes().decode("utf-8", "replace") + "\n")
    return status


def _cmd_echo(args) -> int:
    import yaml

    from bento_ray.config.envsubst import interpolate_env

    doc = yaml.safe_load(
        interpolate_env(open(args.config).read(), os.environ)) or {}
    print(yaml.safe_dump(doc, default_flow_style=False, sort_keys=False))
    return 0


def _cmd_template(args) -> int:
    """``bento template lint`` analog: parse each template file,
    register nothing, run its embedded ``tests:`` blocks."""
    from bento_ray.config.template import Template

    files: list[str] = []
    for pat in args.files:
        files.extend(sorted(glob.glob(pat, recursive=True)) or [pat])
    bad = 0
    for f in files:
        try:
            tmpl = Template.from_file(f)
        except Exception as e:  # noqa: BLE001
            print(f"{f}: {e}")
            bad += 1
            continue
        failures = tmpl.run_tests()
        for fail in failures:
            print(f"{f}: {fail}")
        bad += len(failures)
        if not failures:
            print(f"ok   {f} ({len(tmpl.tests)} tests)")
    return 1 if bad else 0


def _load_templates(args) -> None:
    if getattr(args, "templates", None):
        from bento_ray.config.template import load_templates

        load_templates(args.templates)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bento_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run a config pipeline")
    p_run.add_argument("config")
    p_run.add_argument("--output", help="parquet output path")
    p_run.add_argument("-t", "--templates", action="append", default=[],
                       help="template files/globs to register")
    p_run.set_defaults(fn=_cmd_run)

    p_test = sub.add_parser("test", help="run config unit tests")
    p_test.add_argument("paths", nargs="+")
    p_test.add_argument("-t", "--templates", action="append", default=[],
                        help="template files/globs to register")
    p_test.set_defaults(fn=_cmd_test)

    p_lint = sub.add_parser("lint", help="lint config files")
    p_lint.add_argument("configs", nargs="+")
    p_lint.add_argument("-t", "--templates", action="append", default=[],
                        help="template files/globs to register")
    p_lint.set_defaults(fn=_cmd_lint)

    p_tmpl = sub.add_parser("template",
                            help="template subcommands (lint)")
    tmpl_sub = p_tmpl.add_subparsers(dest="template_cmd", required=True)
    p_tmpl_lint = tmpl_sub.add_parser(
        "lint", help="lint template files and run their embedded tests")
    p_tmpl_lint.add_argument("files", nargs="+")
    p_tmpl_lint.set_defaults(fn=_cmd_template)

    p_blobl = sub.add_parser("blobl", help="run a Bloblang mapping "
                                           "over stdin lines")
    p_blobl.add_argument("mapping")
    p_blobl.set_defaults(fn=_cmd_blobl)

    p_echo = sub.add_parser("echo", help="print the resolved config")
    p_echo.add_argument("config")
    p_echo.set_defaults(fn=_cmd_echo)

    args = ap.parse_args(argv)
    _load_templates(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
