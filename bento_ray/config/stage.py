"""Distributed execution of message-level config processors on Ray Data.

Bridges the ``bento_ray.config.processors`` registry (the per-message
semantic reference implementations: javascript, jq, awk, xml, msgpack,
archive, protobuf, avro, …) onto ``Dataset.map_batches`` so any
processor a YAML config names is runnable inside a distributed
pipeline, mirroring how the reference executes every processor inside
``pipeline.threads`` workers (internal/pipeline/pool.go:32-49).

Execution contract:
- The processor chain is built ONCE per actor (``__init__``) from the
  plain-dict specs; per batch the Arrow rows become a ``Message``
  batch, run through ``run_processors`` (full pipeline semantics:
  cardinality changes, splits, drops), and come back as rows.
- ``cache_resources`` are built per actor. A memory/lru cache is
  therefore ACTOR-LOCAL — exactly-once global semantics come from the
  engine-level stages (``stages.dedupe``, ``state.store`` shard
  routing); the ``file`` cache keeps its cross-process O_EXCL
  contract. Chains that reference a cache are forced to a single
  actor (``concurrency=1``) so they match the reference's
  single-process cache visibility by default.
- Row model auto-detects: a ``content`` string/binary column → content
  mode (output columns ``content`` + ``err``); otherwise each row is
  one structured JSON document (the reference's message payload).

This is the config-parity path; bulk 100 TB pipelines should use the
vectorized stages in ``bento_ray.stages`` — same trade documented in
``bento_ray.blobl.stage``.
"""

from __future__ import annotations

import pyarrow as pa

from bento_ray.blobl.interp import Message
from bento_ray.blobl.values import go_json_dumps

# processor kinds whose semantics depend on state shared across the
# whole stream (a cache or a global rate limit) — run single-actor
_STATEFUL_KINDS = {"dedupe", "cache", "cached", "rate_limit"}


def _chain_is_stateful(specs) -> bool:
    for spec in specs:
        for kind, cfg in spec.items():
            if kind in _STATEFUL_KINDS:
                return True
            # nested children (try/catch/branch/switch/for_each/while)
            if isinstance(cfg, dict):
                for v in cfg.values():
                    if isinstance(v, list) and v and \
                            all(isinstance(x, dict) for x in v):
                        if _chain_is_stateful(v):
                            return True
            elif isinstance(cfg, list) and cfg and \
                    all(isinstance(x, dict) for x in cfg):
                if _chain_is_stateful(cfg):
                    return True
    return False


class ConfigProcessorStage:
    """Callable-class stage for ``Dataset.map_batches``: run a
    message-level processor chain over each Arrow batch."""

    def __init__(self, specs, cache_specs=None, resource_specs=None,
                 content_col: str = "content", env: dict | None = None,
                 base_dir: str | None = None):
        from bento_ray.config.processors import (
            Runtime, build_cache, build_processor, set_config_base_dir,
        )

        set_config_base_dir(base_dir)
        caches: dict = {}
        deferred = []
        for spec in cache_specs or []:
            spec = dict(spec)
            label = spec.pop("label")
            if "multilevel" in spec:
                deferred.append((label, spec))
            else:
                caches[label] = build_cache(spec)
        for label, spec in deferred:
            caches[label] = build_cache(spec, resources=caches)
        proc_resources = {}
        for spec in resource_specs or []:
            s = dict(spec)
            proc_resources[s.get("label")] = build_processor(spec)
        self.procs = [build_processor(dict(s), proc_resources)
                      for s in specs]
        self.rt = Runtime(env=dict(env or {}), caches=caches)
        self.content_col = content_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from bento_ray.config.processors import run_processors

        content_mode = self.content_col in t.column_names and \
            pa.types.is_string(t.schema.field(self.content_col).type) or \
            (self.content_col in t.column_names and
             pa.types.is_binary(t.schema.field(self.content_col).type))
        if content_mode:
            meta_cols = [c for c in t.column_names
                         if c not in (self.content_col, "err")]
            msgs = []
            col = t.column(self.content_col).to_pylist()
            metas = {c: t.column(c).to_pylist() for c in meta_cols}
            for i, v in enumerate(col):
                m = Message(raw=v)
                for c in meta_cols:
                    m.meta[c] = metas[c][i]
                msgs.append(m)
        else:
            msgs = [Message.from_content(r) for r in t.to_pylist()]
        out_batches = run_processors(self.procs, [msgs], self.rt)
        out = [m for b in out_batches for m in b]
        if content_mode:
            raw, errs = [], []
            for m in out:
                raw.append(m.content_bytes())
                errs.append(m.error)
            # keep string output when every payload is valid UTF-8
            # (the common text-chain case); otherwise emit binary —
            # a 'replace' decode of compressed/packed bytes corrupts
            # them irreversibly (U+FFFD substitutions)
            try:
                contents = [b.decode("utf-8") for b in raw]
                col = pa.array(contents, pa.string())
            except UnicodeDecodeError:
                col = pa.array(raw, pa.binary())
            return pa.table({self.content_col: col,
                             "err": pa.array(errs, pa.string())})
        rows = []
        for m in out:
            if m.raw is not None and not m._parsed:
                try:
                    v = m.structured()
                except Exception:
                    v = {self.content_col: m.content_bytes().decode(
                        "utf-8", "replace")}
            else:
                v = m.structured()
            if not isinstance(v, dict):
                v = {self.content_col: go_json_dumps(v)}
            rows.append(v)
        if not rows:
            return pa.table({self.content_col: pa.array([], pa.string())})
        return pa.Table.from_pylist(rows)


def config_processor_stage(ds, specs, cache_specs=None,
                           resource_specs=None,
                           content_col: str = "content",
                           env: dict | None = None,
                           base_dir: str | None = None,
                           concurrency=None,
                           batch_size: int | None = None):
    """Apply a config-registry processor chain distributed over a
    Dataset (actor pool; chain built once per actor)."""
    from bento_ray.util import default_concurrency

    if concurrency is None:
        if _chain_is_stateful(specs):
            concurrency = 1
        else:
            concurrency = (1, default_concurrency())
    return ds.map_batches(
        ConfigProcessorStage,
        fn_constructor_args=(specs, cache_specs, resource_specs,
                             content_col, env, base_dir),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)
