"""Message-level processors for the YAML config surface.

These mirror the reference's per-message processor contracts
(internal/impl/pure/processor_*.go) over ``blobl.Message`` batches.
They power the config test runner and small bounded pipelines; the
DISTRIBUTED execution path for bulk data remains the Arrow-native
stages in ``bento_ray.stages`` — a processor here is the semantic
reference implementation the Ray stages are validated against.

Error contract (processor_mapping.go / processor docs): a failing
processor leaves the message unchanged and flags it; downstream
processors still run and can read ``error()`` / ``errored()``.
"""

from __future__ import annotations

import json

from bento_ray.blobl.interp import Mapping, Message
from bento_ray.blobl.values import BloblangError
from bento_ray.config.field import InterpolatedField
from bento_ray.state.store import LocalCache


class Runtime:
    """Shared resources for one pipeline execution: caches, env,
    counters."""

    def __init__(self, env=None, caches=None):
        self.env = env if env is not None else {}
        self.caches: dict[str, LocalCache] = caches or {}
        self.counters: dict[str, int] = {}


class Processor:
    name = "processor"

    def process_batch(self, batch: list[Message],
                      rt: Runtime) -> list[list[Message]]:
        raise NotImplementedError


class MappingProcessor(Processor):
    """``mapping`` / ``bloblang`` / ``mutation``
    (processor_mapping.go:50-85, processor_bloblang)."""

    def __init__(self, src: str, is_mutation: bool = False,
                 name: str = "mapping"):
        self.name = name
        self.mapping = Mapping(src, is_mutation=is_mutation)

    def process_batch(self, batch, rt):
        out = self.mapping.run_batch(batch, env=rt.env, on_error="mark")
        return [out] if out else []


class DedupeProcessor(Processor):
    """``dedupe`` (processor_dedupe.go:175): interpolated key, cache
    Add-fails-if-exists contract; FIFO keeps the first occurrence,
    LIFO the last within a batch."""

    name = "dedupe"

    def __init__(self, cache: str, key: str, strategy: str = "FIFO",
                 drop_on_err: bool = True):
        self.cache_name = cache
        self.key = InterpolatedField(key)
        self.strategy = strategy.upper()
        self.drop_on_err = drop_on_err

    def process_batch(self, batch, rt):
        cache = rt.caches.get(self.cache_name)
        if cache is None:
            raise ValueError(f"cache resource {self.cache_name} not found")
        order = range(len(batch)) if self.strategy != "LIFO" \
            else range(len(batch) - 1, -1, -1)
        keep = [False] * len(batch)
        for i in order:
            try:
                key = self.key.resolve_message(i, batch, rt.env,
                                               rt.counters)
            except BloblangError as e:
                if self.drop_on_err:
                    continue
                batch[i].error = str(e)
                keep[i] = True
                continue
            keep[i] = cache.add(key, b"t")
        out = [m for i, m in enumerate(batch) if keep[i]]
        return [out] if out else []


class SplitProcessor(Processor):
    """``split`` (processor_split.go:61): re-batch into size-capped
    batches."""

    name = "split"

    def __init__(self, size: int = 1, byte_size: int = 0):
        self.size = size
        self.byte_size = byte_size

    def process_batch(self, batch, rt):
        out: list[list[Message]] = []
        cur: list[Message] = []
        cur_bytes = 0
        for m in batch:
            if self.byte_size > 0:
                b = len(m.content_bytes())
                if cur and cur_bytes + b > self.byte_size:
                    out.append(cur)
                    cur, cur_bytes = [], 0
                cur.append(m)
                cur_bytes += b
            else:
                cur.append(m)
                if len(cur) >= self.size:
                    out.append(cur)
                    cur = []
        if cur:
            out.append(cur)
        return out


class ArchiveProcessor(Processor):
    """``archive`` (processor_archive.go:75-196): batch → 1 message.
    tar/zip entry names come from the interpolated ``path`` field;
    ``binary`` is the reference's length-prefixed blob format
    (message.go:105-136)."""

    name = "archive"

    def __init__(self, format: str = "json_array", path: str = ""):
        self.format = format
        self.path = InterpolatedField(path or "${! count(\"parts\") }")

    def _entry_name(self, i, batch, rt):
        return self.path.resolve_message(i, batch, rt.env, rt.counters)

    def process_batch(self, batch, rt):
        import io
        import tarfile
        import zipfile

        from bento_ray.blobl.values import go_json_dumps

        if not batch:
            return []
        if self.format == "json_array":
            docs = [m.structured() for m in batch]
            raw = go_json_dumps(docs)
        elif self.format == "lines":
            raw = b"\n".join(m.content_bytes() for m in batch)
        elif self.format == "concatenate":
            raw = b"".join(m.content_bytes() for m in batch)
        elif self.format == "tar":
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for i, m in enumerate(batch):
                    data = m.content_bytes()
                    info = tarfile.TarInfo(self._entry_name(i, batch, rt))
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
            raw = buf.getvalue()
        elif self.format == "zip":
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                for i, m in enumerate(batch):
                    zf.writestr(self._entry_name(i, batch, rt),
                                m.content_bytes())
            raw = buf.getvalue()
        elif self.format == "binary":
            parts = [m.content_bytes() for m in batch]
            out = [len(parts).to_bytes(4, "big")]
            for p in parts:
                out.append(len(p).to_bytes(4, "big"))
                out.append(p)
            raw = b"".join(out)
        else:
            raise ValueError(f"unsupported archive format {self.format}")
        return [[Message.from_content(raw, meta=dict(batch[0].meta))]]


class UnarchiveProcessor(Processor):
    """``unarchive`` (processor_unarchive.go:336-352)."""

    name = "unarchive"

    def __init__(self, format: str = "json_array"):
        self.format = format

    def process_batch(self, batch, rt):
        out: list[Message] = []
        for m in batch:
            if self.format == "json_array":
                arr = m.structured()
                if not isinstance(arr, list):
                    m.error = "expected JSON array"
                    out.append(m)
                    continue
                for x in arr:
                    out.append(Message.from_content(
                        x, meta=dict(m.meta)))
            elif self.format == "lines":
                for ln in m.content_bytes().split(b"\n"):
                    out.append(Message.from_content(ln, meta=dict(m.meta)))
            elif self.format == "json_map":
                obj = m.structured()
                for k, v in obj.items():
                    nm = Message.from_content(v, meta=dict(m.meta))
                    nm.meta["archive_key"] = k
                    out.append(nm)
            elif self.format == "json_documents":
                dec = json.JSONDecoder()
                s = m.content_bytes().decode()
                i = 0
                while i < len(s):
                    while i < len(s) and s[i].isspace():
                        i += 1
                    if i >= len(s):
                        break
                    v, i = dec.raw_decode(s, i)
                    out.append(Message.from_content(v, meta=dict(m.meta)))
            elif self.format == "tar":
                import io
                import tarfile

                with tarfile.open(fileobj=io.BytesIO(m.content_bytes()),
                                  mode="r:*") as tf:
                    for info in tf.getmembers():
                        if not info.isfile():
                            continue
                        nm = Message.from_content(
                            tf.extractfile(info).read(), meta=dict(m.meta))
                        nm.meta["archive_filename"] = info.name
                        out.append(nm)
            elif self.format == "zip":
                import io
                import zipfile

                with zipfile.ZipFile(io.BytesIO(m.content_bytes())) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        nm = Message.from_content(
                            zf.read(info), meta=dict(m.meta))
                        nm.meta["archive_filename"] = info.filename
                        out.append(nm)
            elif self.format == "binary":
                b = m.content_bytes()
                n = int.from_bytes(b[:4], "big")
                pos = 4
                for _ in range(n):
                    ln = int.from_bytes(b[pos:pos + 4], "big")
                    pos += 4
                    out.append(Message.from_content(
                        b[pos:pos + ln], meta=dict(m.meta)))
                    pos += ln
            elif self.format == "csv":
                import csv as _csv
                import io

                rows = list(_csv.reader(
                    io.StringIO(m.content_bytes().decode())))
                if rows:
                    hdr = rows[0]
                    for r in rows[1:]:
                        out.append(Message.from_content(
                            dict(zip(hdr, r)), meta=dict(m.meta)))
            else:
                raise ValueError(
                    f"unsupported unarchive format {self.format}")
        return [out] if out else []


class JQProcessor(Processor):
    """``jq`` (processor_jq.go:197-235): query over the structured
    message; 0 outputs drop the message, 1 replaces it, >1 become an
    array; ``output_raw`` emits newline-joined raw text."""

    name = "jq"

    def __init__(self, query: str, output_raw: bool = False,
                 raw: bool = False):
        from bento_ray.jqlang import JQ

        self.q = JQ(query)
        self.output_raw = output_raw or raw

    def process_batch(self, batch, rt):
        out = []
        for m in batch:
            try:
                emitted = self.q(m.structured())
            except Exception as e:
                m.error = str(e)
                out.append(m)
                continue
            if self.output_raw:
                import json as _json

                parts = [x if isinstance(x, str) else
                         _json.dumps(x, separators=(",", ":"))
                         for x in emitted]
                if not parts:
                    continue
                out.append(Message.from_content("\n".join(parts),
                                                meta=dict(m.meta)))
            elif len(emitted) > 1:
                out.append(Message.from_content(emitted, meta=dict(m.meta)))
            elif len(emitted) == 1:
                out.append(Message.from_content(emitted[0],
                                                meta=dict(m.meta)))
            # 0 outputs → drop
        return [out] if out else []


class JMESPathProcessor(Processor):
    """``jmespath`` (processor_jmespath.go): replaces the message with
    the query result; a null result drops the message."""

    name = "jmespath"

    def __init__(self, query: str):
        from bento_ray.jmespath_mini import JMESPath

        self.q = JMESPath(query)

    def process_batch(self, batch, rt):
        out = []
        for m in batch:
            try:
                res = self.q.search(m.structured())
            except Exception as e:
                m.error = str(e)
                out.append(m)
                continue
            if res is None:
                continue
            out.append(Message.from_content(res, meta=dict(m.meta)))
        return [out] if out else []


class XMLProcessor(Processor):
    """``xml`` (internal/impl/xml/processor.go): operator ``to_json``
    parses the message as XML into the mxj-convention document."""

    name = "xml"

    def __init__(self, operator: str = "to_json", cast: bool = False):
        if operator != "to_json":
            raise ValueError(f"unsupported xml operator {operator}")
        self.cast = cast

    def process_batch(self, batch, rt):
        from bento_ray.blobl.methods import m_parse_xml
        from bento_ray.blobl.values import BloblangError

        out = []
        for m in batch:
            try:
                doc = m_parse_xml(m.content_bytes(), self.cast)
            except BloblangError as e:
                m.error = str(e)
                out.append(m)
                continue
            out.append(Message.from_content(doc, meta=dict(m.meta)))
        return [out]


class NoopProcessor(Processor):
    name = "noop"

    def process_batch(self, batch, rt):
        return [batch]


class LogProcessor(Processor):
    name = "log"

    def __init__(self, message: str = "", level: str = "INFO", **_):
        self.message = InterpolatedField(message)

    def process_batch(self, batch, rt):
        return [batch]


class SelectPartsProcessor(Processor):
    name = "select_parts"

    def __init__(self, parts):
        self.parts = parts

    def process_batch(self, batch, rt):
        n = len(batch)
        out = [batch[p] for p in self.parts if -n <= p < n]
        return [out] if out else []


class HTTPProcessor(Processor):
    """Unmocked ``http`` — flags every message (no network in this
    runtime); the test runner replaces it via ``mocks:``."""

    name = "http"

    def __init__(self, **cfg):
        self.cfg = cfg

    def process_batch(self, batch, rt):
        for m in batch:
            m.error = "http processor: network disabled in this runtime"
        return [batch]


def build_cache(spec: dict, resources: dict | None = None):
    """cache_resources entry → cache (memory/lru/ttlru/file/multilevel,
    cache_memory.go:16 / cache_lru.go:42 / cache_ttlru.go:33 /
    io/cache_file.go:18 / cache_multilevel.go:14)."""
    if "memory" in spec:
        c = spec["memory"] or {}
        return LocalCache(ttl_sec=_parse_dur(c.get("default_ttl", "5m")))
    if "lru" in spec:
        c = spec["lru"] or {}
        return LocalCache(max_items=int(c.get("cap", 1000)))
    if "ttlru" in spec:
        c = spec["ttlru"] or {}
        return LocalCache(ttl_sec=_parse_dur(c.get("default_ttl", "5m")),
                          max_items=int(c.get("cap", 1000)))
    if "file" in spec:
        from bento_ray.state.store import FileCache

        return FileCache((spec["file"] or {})["directory"])
    if "multilevel" in spec:
        from bento_ray.state.store import MultilevelCache

        names = spec["multilevel"] or []
        if resources is None:
            raise ValueError("multilevel cache requires named resources")
        return MultilevelCache([resources[n] for n in names])
    raise ValueError(f"unsupported cache resource {list(spec)}")


def _parse_dur(s) -> float:
    if isinstance(s, (int, float)):
        return float(s)
    from bento_ray.blobl.methods import _parse_duration

    return _parse_duration(str(s)) / 1e9


def build_processor(spec: dict, resources: dict | None = None) -> Processor:
    """One processors-list entry → Processor. ``label`` is attached as
    ``.label``; ``resource: name`` resolves from processor_resources."""
    spec = dict(spec)
    label = spec.pop("label", None)
    if not spec:
        raise ValueError("empty processor spec")
    if "resource" in spec:
        name = spec["resource"]
        if not resources or name not in resources:
            raise ValueError(f"processor resource {name} not found")
        proc = resources[name]
    else:
        (kind, cfg), = spec.items()
        proc = _build_by_kind(kind, cfg, resources)
    proc.label = label
    return proc


def _build_by_kind(kind: str, cfg, resources) -> Processor:
    if kind in ("mapping", "bloblang"):
        return MappingProcessor(cfg, name=kind)
    if kind == "mutation":
        return MappingProcessor(cfg, is_mutation=True, name="mutation")
    if kind == "dedupe":
        return DedupeProcessor(cache=cfg["cache"], key=cfg["key"],
                               strategy=cfg.get("strategy", "FIFO"),
                               drop_on_err=cfg.get("drop_on_err", True))
    if kind == "split":
        return SplitProcessor(size=cfg.get("size", 1),
                              byte_size=cfg.get("byte_size", 0))
    if kind == "archive":
        return ArchiveProcessor(format=cfg.get("format", "json_array"))
    if kind == "unarchive":
        return UnarchiveProcessor(format=cfg.get("format", "json_array"))
    if kind == "xml":
        return XMLProcessor(operator=cfg.get("operator", "to_json"),
                            cast=cfg.get("cast", False))
    if kind == "jq":
        return JQProcessor(query=cfg["query"],
                           output_raw=cfg.get("output_raw", False))
    if kind == "jmespath":
        return JMESPathProcessor(query=cfg["query"])
    if kind == "noop":
        return NoopProcessor()
    if kind == "log":
        return LogProcessor(**(cfg or {}))
    if kind == "select_parts":
        return SelectPartsProcessor(parts=cfg.get("parts", [0]))
    if kind == "http":
        return HTTPProcessor(**(cfg or {}))
    raise ValueError(f"unsupported processor kind {kind!r}")


def run_processors(procs: list[Processor], batches: list[list[Message]],
                   rt: Runtime) -> list[list[Message]]:
    """Run a processor chain over input batches (pipeline semantics:
    each processor maps every current batch to 0..n batches)."""
    for p in procs:
        nxt: list[list[Message]] = []
        for b in batches:
            nxt.extend(p.process_batch(list(b), rt))
        batches = nxt
    return batches
