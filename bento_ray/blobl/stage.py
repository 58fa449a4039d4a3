"""Distributed execution of compiled Bloblang mappings on Ray Data.

The mapping compiles ONCE per actor (``__init__``), then executes
per batch inside ``map_batches`` — the reference's
``pipeline.threads`` parallelism becomes the actor-pool ``concurrency``
(internal/pipeline/pool.go:32-49).

Two row models:
- ``mode="structured"``: each row is one JSON document (columns =
  top-level fields). Rich but pays Arrow→Python→Arrow per batch — use
  for config-parity pipelines, not 100 TB bulk paths (those use the
  vectorized stages in bento_ray.stages; see docstring note below).
- ``mode="content"``: one string/binary column carries the serialized
  message; other columns pass through for surviving rows.

Scale note: a Bloblang mapping is an arbitrary per-document program, so
the batch function IS a Python loop (exactly as the reference executes
one message at a time, executor.go:115). The distribution contract is
what matters at scale: stateless actors, zero driver involvement, and
batch sizes bounded by ``batch_size`` rows. For mappings expressible
as column kernels, prefer the vectorized ``bento_ray.functions``
registry / ``stages.core.map_columns`` path.
"""

from __future__ import annotations

import pyarrow as pa

from bento_ray.blobl.interp import Mapping, Message
from bento_ray.blobl.values import go_json_dumps


class MappingStage:
    """Callable-class stage for ``Dataset.map_batches``."""

    def __init__(self, src: str, is_mutation: bool = False,
                 mode: str = "structured", content_col: str = "content",
                 env: dict | None = None):
        self.mapping = Mapping(src, is_mutation=is_mutation)
        self.mode = mode
        self.content_col = content_col
        self.env = env or {}
        # simple column mappings compile to Arrow kernels — zero
        # per-row Python (blobl/vectorize.py); the rest interpret
        self.vectorized = None
        if mode in ("structured", "auto"):
            from bento_ray.blobl.vectorize import (
                NotVectorizable, compile_vectorized,
            )

            try:
                self.vectorized = compile_vectorized(self.mapping)
            except NotVectorizable:
                self.vectorized = None

    def _resolve_mode(self, t: pa.Table) -> str:
        # "auto": a string/binary content column means the batch came
        # from a content-bearing input (file scanner, raw payloads) —
        # the reference's message model where content() IS the segment
        # bytes; anything else is one structured document per row
        if self.mode != "auto":
            return self.mode
        if self.content_col in t.column_names:
            typ = t.schema.field(self.content_col).type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ) \
                    or pa.types.is_binary(typ) \
                    or pa.types.is_large_binary(typ):
                return "content"
        return "structured"

    def __call__(self, t: pa.Table) -> pa.Table:
        mode = self._resolve_mode(t)
        if self.vectorized is not None and mode == "structured":
            try:
                return self.vectorized(t)
            except Exception:  # noqa: BLE001 — NotVectorizable, or an
                # Arrow kernel error the compile pass couldn't predict
                # (e.g. string column + int column): the row-wise
                # interpreter owns the batch and marks per-message
                # errors instead of the whole Ray task dying
                pass
        if mode == "content":
            return self._content_batch(t)
        return self._structured_batch(t)

    def _structured_batch(self, t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        msgs = [Message.from_content(r) for r in rows]
        out = self.mapping.run_batch(msgs, env=self.env, on_error="mark")
        out_rows = []
        for m in out:
            v = m.structured() if m.raw is None or m._parsed else {
                self.content_col: m.raw}
            if not isinstance(v, dict):
                v = {self.content_col: go_json_dumps(v)}
            out_rows.append(v)
        if not out_rows:
            return t.slice(0, 0)
        return pa.Table.from_pylist(out_rows)

    def _content_batch(self, t: pa.Table) -> pa.Table:
        from bento_ray.blobl.values import BloblangError

        col = t.column(self.content_col).to_pylist()
        msgs = [Message.from_content(v) for v in col]
        keep_idx: list[int] = []
        contents: list = []
        errs: list = []
        counters: dict = {}
        # per-index execution keeps batch context (batch_index/from_all)
        # AND row alignment — a deleted message drops its row
        for i in range(len(msgs)):
            try:
                res = self.mapping._map_part(i, msgs, self.env, counters)
            except BloblangError as e:
                res = msgs[i]
                res.error = str(e)
            if res is None:
                continue
            keep_idx.append(i)
            contents.append(res.content_bytes().decode("utf-8", "replace"))
            errs.append(res.error)
        kept = t.take(pa.array(keep_idx, pa.int64()))
        pos = kept.schema.get_field_index(self.content_col)
        kept = kept.set_column(pos, self.content_col,
                               pa.array(contents, pa.string()))
        if "err" in kept.column_names:
            kept = kept.set_column(
                kept.schema.get_field_index("err"), "err",
                pa.array(errs, pa.string()))
        return kept


def generate_dataset(count: int, mapping_src: str,
                     env: dict | None = None, batch_size: int = 4096):
    """``generate`` input (input_generate.go): produce ``count``
    documents by executing a Bloblang mapping with no input context.
    Distributed over index ranges; generator functions (uuid_v4,
    random_int(seed:...), timestamp…) run inside the tasks. The shared
    ``count()`` counter is per-task here, not global — seed-based
    generators are the deterministic path."""
    import ray.data as rd

    def _gen(b) -> pa.Table:
        m = Mapping(mapping_src)
        n = len(b["id"])
        msgs = [Message.from_content({}) for _ in range(n)]
        out = m.run_batch(msgs, env=env or {}, on_error="mark")
        rows = []
        for msg in out:
            if msg._parsed and isinstance(msg.structured(), dict):
                rows.append(msg.structured())
            else:
                rows.append({"content": msg.content_bytes().decode(
                    "utf-8", "replace")})
        if not rows:
            return pa.table({"content": pa.array([], pa.string())})
        return pa.Table.from_pylist(rows)

    return rd.range(count).map_batches(_gen, batch_format="numpy",
                                       batch_size=batch_size)


def mapping_stage(ds, src: str, is_mutation: bool = False,
                  mode: str = "structured", content_col: str = "content",
                  env: dict | None = None, concurrency=None,
                  batch_size: int | None = None):
    """Apply a Bloblang mapping string distributed over a Dataset."""
    from bento_ray.util import default_concurrency

    if concurrency is None:
        concurrency = (1, default_concurrency())
    return ds.map_batches(
        MappingStage, fn_constructor_args=(src, is_mutation, mode,
                                           content_col, env),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)
