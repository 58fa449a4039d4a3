"""Declarative pipeline builder — the reference's config-driven
input→pipeline→output surface (SURVEY.md §2.11, §3.1) re-expressed as a
small spec compiled onto a Dataset plan.

The reference assembles ``stream.Config{Input, Buffer, Pipeline,
Output}`` from YAML with no planner (§3.1: config maps 1:1 to a
component tree); here a ``Pipeline`` is an ordered list of named stages
compiled 1:1 onto Dataset operators, so a user can port a Bento config
stanza mechanically:

    p = (Pipeline.read_parquet(path, columns=[...])
           .mapping(fn)
           .filter(pred)
           .dedupe(["url"], order_cols=["warc_ts"])
           .tumbling_window("warc_ts", 10_000_000)
           .group_aggregate(["window_end", "lang"],
                            n=Count(), total=Sum("nbytes"))
           .broadcast_join(dim, on="lang"))
    ds = p.dataset()          # lazy Dataset
    p.write_parquet(out_dir)  # or a sink

Registered custom stages (the plugin surface,
``service.RegisterBatchProcessor`` analog): ``@register_processor``
makes a batch fn / actor class available by name for spec-driven
construction via ``Pipeline.from_spec``.
"""

from __future__ import annotations

from typing import Callable

import ray.data as rd

_PROCESSORS: dict[str, Callable] = {}


def register_processor(name: str):
    """Plugin registration hook (public/service RegisterBatchProcessor
    analog): the decorated callable (batch fn or actor class factory)
    becomes available to Pipeline.from_spec under ``name``."""

    def deco(fn):
        _PROCESSORS[name] = fn
        return fn

    return deco


class Pipeline:
    def __init__(self, ds):
        self._ds = ds

    # -- sources ------------------------------------------------------
    @classmethod
    def read_parquet(cls, path, columns=None, **kw) -> "Pipeline":
        from bento_ray.sources.inputs import read_parquet

        return cls(read_parquet(path, columns=columns, **kw))

    @classmethod
    def from_dataset(cls, ds) -> "Pipeline":
        return cls(ds)

    # -- per-record stages --------------------------------------------
    def mapping(self, fn, **kw) -> "Pipeline":
        from bento_ray.stages.core import mapping

        return Pipeline(mapping(self._ds, fn, **kw))

    def filter(self, predicate) -> "Pipeline":
        from bento_ray.stages.core import filter_rows

        return Pipeline(filter_rows(self._ds, predicate))

    def apply(self, method: str, col: str, *args, out: str | None = None,
              **kw) -> "Pipeline":
        """Apply a registered Bloblang-equivalent method to a column."""
        from bento_ray.functions import apply_method

        return self.mapping(
            lambda t: apply_method(t, col, method, *args, out=out, **kw))

    def switch(self, cases, fallthrough=None) -> "Pipeline":
        from bento_ray.stages.compose import switch

        return Pipeline(switch(self._ds, cases, fallthrough))

    def branch(self, request_map, child, result_map) -> "Pipeline":
        from bento_ray.stages.compose import branch

        return Pipeline(branch(self._ds, request_map, child, result_map))

    def try_(self, fn) -> "Pipeline":
        from bento_ray.stages.compose import try_stage

        return Pipeline(try_stage(self._ds, fn))

    def catch(self, fn=None) -> "Pipeline":
        from bento_ray.stages.compose import catch_errors

        return Pipeline(catch_errors(self._ds, fn))

    def processor(self, name: str, *args, **kw) -> "Pipeline":
        """Apply a @register_processor stage by name."""
        return Pipeline(_PROCESSORS[name](self._ds, *args, **kw))

    # -- keyed / wide stages ------------------------------------------
    def dedupe(self, key_cols, keep="first", order_cols=None) -> "Pipeline":
        from bento_ray.stages.dedupe import dedupe_exact

        return Pipeline(dedupe_exact(self._ds, key_cols, keep, order_cols))

    def tumbling_window(self, ts_col, size_us, offset_us=0) -> "Pipeline":
        from bento_ray.stages.window import assign_tumbling

        return self.mapping(
            lambda t: assign_tumbling(t, ts_col, size_us, offset_us))

    def sliding_window(self, ts_col, size_us, slide_us,
                       offset_us=0) -> "Pipeline":
        from bento_ray.stages.window import assign_sliding

        return self.mapping(
            lambda t: assign_sliding(t, ts_col, size_us, slide_us, offset_us))

    def session_windows(self, key_col, ts_col, gap_us) -> "Pipeline":
        from bento_ray.stages.window import assign_session_windows

        return Pipeline(assign_session_windows(self._ds, key_col, ts_col,
                                               gap_us))

    def group_aggregate(self, keys, *aggs) -> "Pipeline":
        """aggs: ray.data.aggregate.AggregateFn instances (construct
        with ``alias_name=`` so output columns are named)."""
        return Pipeline(self._ds.groupby(keys).aggregate(*aggs))

    def broadcast_join(self, small, on, how="left", **kw) -> "Pipeline":
        from bento_ray.stages.join import broadcast_join

        return Pipeline(broadcast_join(self._ds, small, on, how, **kw))

    def join(self, other: "Pipeline | Any", on, how="inner", **kw) -> "Pipeline":
        from bento_ray.stages.join import shuffle_join

        right = other._ds if isinstance(other, Pipeline) else other
        return Pipeline(shuffle_join(self._ds, right, on, how, **kw))

    def union(self, other: "Pipeline") -> "Pipeline":
        return Pipeline(self._ds.union(other._ds))

    def sort(self, keys, descending=False) -> "Pipeline":
        return Pipeline(self._ds.sort(keys, descending=descending))

    def limit(self, n: int) -> "Pipeline":
        return Pipeline(self._ds.limit(n))

    # -- sinks --------------------------------------------------------
    def dataset(self):
        return self._ds

    def write_parquet(self, path, **kw):
        return self._ds.write_parquet(path, **kw)

    def drop(self) -> int:
        return self._ds.count()

    def to_pandas(self):
        return self._ds.to_pandas()

    # -- Bloblang ------------------------------------------------------
    def bloblang(self, src: str, mode: str = "structured",
                 **kw) -> "Pipeline":
        """Apply a Bloblang mapping STRING distributed over the
        Dataset (the reference's ``mapping``/``bloblang`` processor,
        processor_mapping.go) — compiled once per actor."""
        from bento_ray.blobl.stage import mapping_stage

        return Pipeline(mapping_stage(self._ds, src, mode=mode, **kw))

    def mutation(self, src: str, mode: str = "structured",
                 **kw) -> "Pipeline":
        from bento_ray.blobl.stage import mapping_stage

        return Pipeline(mapping_stage(self._ds, src, is_mutation=True,
                                      mode=mode, **kw))

    # -- spec compilation ---------------------------------------------
    @classmethod
    def from_yaml(cls, path_or_text: str, env: dict | None = None
                  ) -> "Pipeline":
        """Compile a Bento-shaped YAML config (input → pipeline →
        output sections) with ``${FOO:default}`` env interpolation
        (internal/config/env_vars.go, reader.go). Supported inputs:
        ``parquet``/``file``/``csv``/``generate``; processors: any
        ``from_spec`` name plus ``mapping``/``bloblang``/``mutation``
        mapping strings."""
        import os as _os

        import yaml as _yaml

        from bento_ray.config.envsubst import interpolate_env

        text = path_or_text
        base_dir = None
        if "\n" not in path_or_text and _os.path.exists(path_or_text):
            text = open(path_or_text).read()
            base_dir = _os.path.dirname(_os.path.abspath(path_or_text))
        doc = _yaml.safe_load(interpolate_env(
            text, env if env is not None else _os.environ)) or {}
        spec: dict = {}
        if "input" in doc:
            spec["input"] = doc["input"]
        for key in ("cache_resources", "processor_resources"):
            if doc.get(key):
                spec[key] = doc[key]
        if base_dir:
            spec["base_dir"] = base_dir
        steps = (doc.get("pipeline") or {})
        if isinstance(steps, dict):
            steps = steps.get("processors", [])
        spec["pipeline"] = []
        for step in steps or []:
            step = dict(step)
            step.pop("label", None)
            (name, cfg), = step.items()
            if name in ("mapping", "bloblang"):
                # auto: content-bearing inputs (file scanner rows) get
                # reference message semantics (content() = segment)
                spec["pipeline"].append(
                    {"bloblang": {"src": cfg, "mode": "auto"}})
            elif name == "mutation":
                spec["pipeline"].append(
                    {"mutation": {"src": cfg, "mode": "auto"}})
            else:
                spec["pipeline"].append({name: cfg or {}})
        return cls.from_spec(spec)

    @classmethod
    def from_spec(cls, spec: dict) -> "Pipeline":
        """Compile a declarative dict spec (the YAML-config analog):

            {"input": {"parquet": {"path": ..., "columns": [...]}},
             "pipeline": [{"processor_name": {...kwargs}}, ...]}

        Processor names resolve against the @register_processor
        registry plus the built-in stage methods."""
        inp = spec["input"]
        if "parquet" in inp:
            p = cls.read_parquet(**inp["parquet"])
        elif "csv" in inp:
            from bento_ray.sources.inputs import read_csv

            cfg = dict(inp["csv"])
            p = cls(read_csv(cfg.pop("paths", cfg.pop("path", None)), **cfg))
        elif "stdin" in inp:
            # input_stdin.go: consume piped stdin, chopped into
            # messages by the configured scanner (default: lines).
            # Single-process by nature — the read happens on the
            # driver, processing fans out as a Dataset.
            import sys

            import pyarrow as _pa

            import ray.data as _rd

            from bento_ray.sources.scanners import build_scanner

            cfg = dict(inp["stdin"] or {})
            scan = build_scanner(cfg.get("scanner") or {"lines": {}})
            data = sys.stdin.buffer.read()
            p = cls(_rd.from_arrow(_pa.table({
                "content": _pa.array(list(scan(data)), _pa.binary())})))
        elif "file" in inp:
            cfg = dict(inp["file"])
            paths = cfg.pop("paths", cfg.pop("path", None))
            scanner_cfg = cfg.pop("scanner", None)
            if scanner_cfg is not None:
                # input_file.go scanner field: explode each file through
                # the configured scanner (columns content/path)
                from bento_ray.sources.scanners import (
                    build_scanner, scan_paths,
                )

                p = cls(scan_paths(paths, build_scanner(scanner_cfg)))
            else:
                from bento_ray.sources.inputs import read_lines

                p = cls(read_lines(paths))
        elif "generate" in inp:
            from bento_ray.blobl.stage import generate_dataset

            cfg = inp["generate"]
            p = cls(generate_dataset(int(cfg.get("count", 0)),
                                     cfg["mapping"]))
        elif "resource" in inp:
            from bento_ray.sources.inputs import resource

            name = inp["resource"] if isinstance(inp["resource"], str) \
                else inp["resource"]["name"]
            p = cls(resource(name))
        else:
            from bento_ray.config.template import lookup_template

            (iname, icfg), = inp.items() if isinstance(inp, dict) else [
                (inp, {})]
            tmpl = lookup_template("input", iname)
            if tmpl is None:
                raise ValueError(f"unsupported input: {list(inp)}")
            # render the input template; any attached input-level
            # processors run ahead of the pipeline section
            rendered = tmpl.render(icfg or {})
            inner_procs = rendered.pop("processors", []) \
                if isinstance(rendered, dict) else []
            sub = dict(spec)
            sub["input"] = rendered
            sub["pipeline"] = list(inner_procs) + list(
                spec.get("pipeline", []))
            return cls.from_spec(sub)
        import inspect

        from bento_ray.config.processors import CONFIG_PROCESSOR_KINDS

        def _binds(fn, kwargs) -> bool:
            if not isinstance(kwargs, dict):
                return False
            try:
                inspect.signature(fn).bind(**kwargs)
                return True
            except TypeError:
                return False

        # consecutive config-registry steps compile into ONE
        # actor-pool bridge stage so the chain keeps the reference's
        # batch semantics (splits, drops) without N pools
        pending: list[dict] = []

        def _flush(p: "Pipeline") -> "Pipeline":
            if not pending:
                return p
            from bento_ray.config.stage import config_processor_stage

            out = Pipeline(config_processor_stage(
                p._ds, list(pending),
                cache_specs=spec.get("cache_resources"),
                resource_specs=spec.get("processor_resources"),
                base_dir=spec.get("base_dir")))
            pending.clear()
            return out

        from collections import deque

        from bento_ray.config.template import lookup_template

        queue = deque(spec.get("pipeline", []))
        while queue:
            step = queue.popleft()
            (name, kwargs), = step.items()
            if name in _PROCESSORS:
                p = _flush(p)
                p = Pipeline(_PROCESSORS[name](p._ds, **kwargs))
            elif hasattr(p, name) and _binds(getattr(p, name), kwargs):
                p = _flush(p)
                p = getattr(p, name)(**kwargs)
            elif name in CONFIG_PROCESSOR_KINDS:
                pending.append({name: kwargs})
            elif lookup_template("processor", name) is not None:
                # config template: render the macro and process the
                # resulting real component config in its place
                rendered = lookup_template("processor", name) \
                    .render(kwargs or {})
                queue.appendleft(rendered)
            else:
                raise ValueError(f"unknown processor: {name}")
        return _flush(p)
