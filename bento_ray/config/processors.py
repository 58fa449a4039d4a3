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
import os

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
        out = self.mapping.run_batch(batch, env=rt.env, on_error="mark",
                                     counters=rt.counters)
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
        if not batch:
            return []
        try:
            return self._archive(batch, rt)
        except Exception as e:  # noqa: BLE001 — error-routing contract
            # a failing processor leaves the batch unchanged and
            # flags it (module contract; processor_archive.go fails
            # the whole batch on any part error)
            for m in batch:
                m.error = f"archive: {e}"
            return [batch]

    def _archive(self, batch, rt):
        import io
        import tarfile
        import zipfile

        from bento_ray.blobl.values import go_json_dumps

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
            try:
                out.extend(self._expand(m))
            except Exception as e:  # noqa: BLE001 — error contract
                # corrupt payloads (bad JSON/tar/zip/binary counts)
                # flag THIS message and pass it through unchanged
                # instead of killing the whole batch
                m.error = f"unarchive: {e}"
                out.append(m)
        return [out] if out else []

    def _expand(self, m) -> list:
        out: list[Message] = []
        if True:
            if self.format == "json_array":
                arr = m.structured()
                if not isinstance(arr, list):
                    m.error = "expected JSON array"
                    return [m]
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
        return out


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


def _eval_check(check_src: str, msg: Message, env, counters) -> bool:
    """Evaluate a Bloblang check query against one message → bool
    (null is honorary false, matching if-condition semantics)."""
    from bento_ray.blobl.interp import Context, _LazyThis, eval_query
    from bento_ray.blobl.parser import parse_query
    from bento_ray.blobl.values import NOTHING, get_bool

    ctx = Context(stack=(_LazyThis(msg.structured),), named={}, vars={},
                  meta=dict(msg.meta), root_ref=[NOTHING], index=0,
                  batch=[msg], maps={}, env=env, counters=counters,
                  legacy={"error": msg.error})
    v = eval_query(parse_query(check_src), ctx)
    if v is None or v is NOTHING:
        return False
    return get_bool(v)


class SwitchProcessor(Processor):
    """``switch`` (processor_switch.go): per-message Bloblang ``check``
    per case (empty check matches all); matched messages run the case's
    processors; ``fallthrough`` also forwards them to the next case;
    unmatched messages pass through unchanged. Input order restored."""

    name = "switch"

    def __init__(self, cases: list[dict], resources=None):
        self.cases = []
        for c in cases:
            self.cases.append({
                "check": c.get("check", ""),
                "procs": [build_processor(p, resources)
                          for p in c.get("processors", [])],
                "fallthrough": c.get("fallthrough", False),
            })

    def process_batch(self, batch, rt):
        # positions are (input_index, sequence) so case processors that
        # CHANGE the message count (split/unarchive/drop) keep every
        # output, anchored at the first matched input position
        remaining = [((i, 0), m) for i, m in enumerate(batch)]
        out: list[tuple[tuple, Message]] = []
        for case in self.cases:
            matched, rest = [], []
            for pos, m in remaining:
                try:
                    ok = not case["check"] or _eval_check(
                        case["check"], m, rt.env, rt.counters)
                except Exception as e:  # noqa: BLE001
                    m.error = str(e)
                    ok = False
                (matched if ok else rest).append((pos, m))
            if matched:
                res = run_processors(case["procs"],
                                     [[m for _, m in matched]], rt)
                flat = [m for b in res for m in b]
                if len(flat) == len(matched):
                    paired = [(pos, m) for (pos, _), m
                              in zip(matched, flat)]
                else:
                    anchor = matched[0][0]
                    paired = [((anchor[0], anchor[1] + j + 1), m)
                              for j, m in enumerate(flat)]
                if case["fallthrough"]:
                    rest = sorted(rest + paired, key=lambda t: t[0])
                else:
                    out.extend(paired)
            remaining = rest
        out.extend(remaining)
        out.sort(key=lambda t: t[0])
        final = [m for _, m in out]
        return [final] if final else []


class BranchProcessor(Processor):
    """``branch`` (processor_branch.go): request_map builds the branch
    message (root=deleted() skips the branch), child processors run,
    result_map merges the result back onto the ORIGINAL message.
    Failures at any stage flag the original message and leave it
    unchanged."""

    name = "branch"

    def __init__(self, request_map: str = "root = this",
                 processors: list | None = None,
                 result_map: str = "root = this", resources=None):
        self.request = Mapping(request_map or "root = this")
        self.procs = [build_processor(p, resources)
                      for p in (processors or [])]
        self.result_src = result_map or "root = this"

    def process_batch(self, batch, rt):
        from bento_ray.blobl.interp import (
            Context, _LazyThis, exec_statements,
        )
        from bento_ray.blobl.parser import parse_mapping
        from bento_ray.blobl.values import NOTHING, BloblangError, clone

        result_stmts = parse_mapping(self.result_src)
        for m in batch:
            try:
                reqs = self.request.run_batch(
                    [Message.from_content(clone(m.structured()),
                                          meta=dict(m.meta))],
                    env=rt.env)
            except BloblangError as e:
                m.error = f"request map: {e}"
                continue
            if not reqs:
                continue  # deleted() → skip branch for this message
            res_batches = run_processors(self.procs, [reqs], rt)
            results = [x for b in res_batches for x in b]
            if not results:
                continue
            res = results[0]
            if res.error:
                m.error = res.error
                continue
            try:
                # result_map: this = branch result, root = original doc
                root_ref = [clone(m.structured())]
                ctx = Context(stack=(_LazyThis(res.structured),),
                              named={}, vars={}, meta=m.meta,
                              root_ref=root_ref, index=0, batch=[res],
                              maps={}, env=rt.env, counters=rt.counters,
                              legacy={"error": res.error})
                exec_statements(result_stmts, ctx)
                if root_ref[0] is not NOTHING:
                    m._structured = root_ref[0]
                    m._parsed = True
                    m.raw = None
            except BloblangError as e:
                m.error = f"result map: {e}"
        return [batch]


class TryProcessor(Processor):
    """``try`` (processor_try.go): child processors run in order; a
    message that errors skips the remaining children."""

    name = "try"

    def __init__(self, processors: list, resources=None):
        self.procs = [build_processor(p, resources) for p in processors]

    def process_batch(self, batch, rt):
        # positions preserved: an errored message keeps its input slot
        # while healthy ones continue through the chain
        current = list(enumerate(batch))
        done: list[tuple[int, Message]] = []
        for p in self.procs:
            ok = [(i, m) for i, m in current if not m.error]
            done.extend((i, m) for i, m in current if m.error)
            if not ok:
                current = []
                break
            res = p.process_batch([m for _, m in ok], rt)
            flat = [m for b in res for m in b]
            if len(flat) == len(ok):
                current = [(i, m) for (i, _), m in zip(ok, flat)]
            else:
                anchor = ok[0][0]
                current = list(enumerate(flat, start=anchor))
        merged = sorted(done + current, key=lambda t: t[0])
        final = [m for _, m in merged]
        return [final] if final else []


class CatchProcessor(Processor):
    """``catch`` (processor_catch.go): children run only on errored
    messages; surviving messages have their error cleared."""

    name = "catch"

    def __init__(self, processors: list, resources=None):
        self.procs = [build_processor(p, resources) for p in processors]

    def process_batch(self, batch, rt):
        errored = [(i, m) for i, m in enumerate(batch) if m.error]
        clean = [(i, m) for i, m in enumerate(batch) if not m.error]
        if errored:
            res = run_processors(self.procs, [[m for _, m in errored]],
                                 rt)
            flat = [m for b in res for m in b]
            if len(flat) == len(errored):
                recovered = [(i, m) for (i, _), m in zip(errored, flat)]
            else:
                anchor = errored[0][0] if errored else 0
                recovered = list(enumerate(flat, start=anchor))
            for _, m in recovered:
                m.error = None
            clean = sorted(clean + recovered, key=lambda t: t[0])
        final = [m for _, m in clean]
        return [final] if final else []


class RetryProcessor(Processor):
    """``retry`` (processor_retry.go): re-run the children on errored
    messages up to ``max_retries`` with (test-friendly) backoff."""

    name = "retry"

    def __init__(self, processors: list, max_retries: int = 3,
                 backoff: dict | None = None, resources=None):
        self.procs = [build_processor(p, resources) for p in processors]
        self.max_retries = max_retries
        b = backoff or {}
        self.initial = _parse_dur(b.get("initial_interval", 0))

    def process_batch(self, batch, rt):
        import time as _time

        res = run_processors(self.procs, [list(batch)], rt)
        out = [(i, m) for i, m in enumerate(m for b in res for m in b)]
        attempt = 0
        while any(m.error for _, m in out) and attempt < self.max_retries:
            attempt += 1
            if self.initial:
                _time.sleep(min(self.initial * attempt, 0.05))
            errored = [(i, m) for i, m in out if m.error]
            ok = [(i, m) for i, m in out if not m.error]
            for _, m in errored:
                m.error = None
            res = run_processors(self.procs, [[m for _, m in errored]],
                                 rt)
            flat = [m for b in res for m in b]
            if len(flat) == len(errored):
                redone = [(i, m) for (i, _), m in zip(errored, flat)]
            else:
                anchor = errored[0][0] if errored else 0
                redone = list(enumerate(flat, start=anchor))
            out = sorted(ok + redone, key=lambda t: t[0])
        final = [m for _, m in out]
        return [final] if final else []


class ForEachProcessor(Processor):
    """``for_each``: children run on each message as its own batch."""

    name = "for_each"

    def __init__(self, processors: list, resources=None):
        self.procs = [build_processor(p, resources) for p in processors]

    def process_batch(self, batch, rt):
        out: list[Message] = []
        for m in batch:
            res = run_processors(self.procs, [[m]], rt)
            out.extend(x for b in res for x in b)
        return [out] if out else []


class WhileProcessor(Processor):
    """``while``: re-run children while the check holds on the first
    message (bounded by max_loops)."""

    name = "while"

    def __init__(self, check: str, processors: list,
                 max_loops: int = 100, at_least_once: bool = False,
                 resources=None):
        self.check = check
        self.procs = [build_processor(p, resources) for p in processors]
        self.max_loops = max_loops
        self.at_least_once = at_least_once

    def process_batch(self, batch, rt):
        loops = 0
        current = list(batch)
        while current and loops < self.max_loops:
            if not self.at_least_once or loops > 0:
                if not _eval_check(self.check, current[0], rt.env,
                                   rt.counters):
                    break
            res = run_processors(self.procs, [current], rt)
            current = [m for b in res for m in b]
            loops += 1
        return [current] if current else []


class CacheProcessor(Processor):
    """``cache`` processor (processor_cache.go): get/set/add/delete
    with interpolated key/value against a cache resource. ``get``
    replaces the message content; a failed ``add`` or missing ``get``
    flags the message."""

    name = "cache"

    def __init__(self, resource: str, operator: str, key: str,
                 value: str = ""):
        self.resource = resource
        self.operator = operator
        self.key = InterpolatedField(key)
        self.value = InterpolatedField(value) if value else None

    def process_batch(self, batch, rt):
        cache = rt.caches.get(self.resource)
        if cache is None:
            raise ValueError(f"cache resource {self.resource} not found")
        for i, m in enumerate(batch):
            k = self.key.resolve_message(i, batch, rt.env, rt.counters)
            if self.operator == "get":
                v = cache.get(k)
                if v is None:
                    m.error = "key does not exist"
                else:
                    m.raw = v
                    m._structured = None
                    m._parsed = False
            elif self.operator == "set":
                v = self.value.resolve_message(i, batch, rt.env,
                                               rt.counters) \
                    if self.value else m.content_bytes()
                cache.set(k, v if isinstance(v, bytes) else v.encode())
            elif self.operator == "add":
                v = self.value.resolve_message(i, batch, rt.env,
                                               rt.counters) \
                    if self.value else m.content_bytes()
                if not cache.add(k, v if isinstance(v, bytes)
                                 else v.encode()):
                    m.error = "key already exists"
            elif self.operator == "delete":
                cache.delete(k)
            else:
                raise ValueError(
                    f"unsupported cache operator {self.operator}")
        return [batch]


class SleepProcessor(Processor):
    name = "sleep"

    def __init__(self, duration: str = "0s"):
        self.seconds = min(_parse_dur(duration), 1.0)  # test-bounded

    def process_batch(self, batch, rt):
        import time as _time

        if self.seconds:
            _time.sleep(self.seconds)
        return [batch]


class MetricProcessor(Processor):
    """``metric`` (processor_metric.go): counter / counter_by / gauge /
    timing against the runtime's counter map. ``value`` is an
    interpolated expression resolved per message; labels are folded
    into the metric key (label-set → distinct series, the flattened
    form of the reference's tagged metrics)."""

    name = "metric"

    def __init__(self, name: str = "", type: str = "counter",
                 value: str = "", labels: dict | None = None):
        self.metric_name = name
        self.type = type
        self.value = InterpolatedField(value) if value else None
        self.labels = {k: InterpolatedField(v)
                       for k, v in (labels or {}).items()}

    def _key(self, i, batch, rt) -> str:
        if not self.labels:
            return self.metric_name
        parts = [f"{k}={self.labels[k].resolve_message(i, batch, rt.env, rt.counters)}"
                 for k in sorted(self.labels)]
        return self.metric_name + "{" + ",".join(parts) + "}"

    def _num(self, i, batch, rt) -> float:
        s = self.value.resolve_message(i, batch, rt.env, rt.counters)
        try:
            return float(s)
        except (TypeError, ValueError):
            return 0.0

    def process_batch(self, batch, rt):
        if self.type in ("gauge", "timing"):
            # last write wins (gauge semantics); timing stores the
            # latest observation the same way
            for i, _ in enumerate(batch):
                v = self._num(i, batch, rt) if self.value else 0.0
                rt.counters[self._key(i, batch, rt)] = v
        elif self.type == "counter_by" and self.value is not None:
            for i, _ in enumerate(batch):
                k = self._key(i, batch, rt)
                rt.counters[k] = rt.counters.get(k, 0) + \
                    self._num(i, batch, rt)
        elif self.labels:
            for i, _ in enumerate(batch):
                k = self._key(i, batch, rt)
                rt.counters[k] = rt.counters.get(k, 0) + 1
        else:
            rt.counters[self.metric_name] = \
                rt.counters.get(self.metric_name, 0) + len(batch)
        return [batch]


class GroupByValueProcessor(Processor):
    """``group_by_value``: split the batch into one batch per distinct
    interpolated value (processor_group_by_value.go)."""

    name = "group_by_value"

    def __init__(self, value: str):
        self.value = InterpolatedField(value)

    def process_batch(self, batch, rt):
        groups: dict[str, list[Message]] = {}
        for i, m in enumerate(batch):
            k = self.value.resolve_message(i, batch, rt.env, rt.counters)
            groups.setdefault(k, []).append(m)
        return [g for g in groups.values()]


class BoundsCheckProcessor(Processor):
    name = "bounds_check"

    def __init__(self, max_part_size: int = 1 << 30, min_part_size: int = 1,
                 max_parts: int = 100, min_parts: int = 1):
        self.max_part_size = max_part_size
        self.min_part_size = min_part_size
        self.max_parts = max_parts
        self.min_parts = min_parts

    def process_batch(self, batch, rt):
        if not (self.min_parts <= len(batch) <= self.max_parts):
            return []
        for m in batch:
            n = len(m.content_bytes())
            if not (self.min_part_size <= n <= self.max_part_size):
                return []
        return [batch]


class ParseLogProcessor(Processor):
    name = "parse_log"

    def __init__(self, format: str = "syslog_rfc3164",
                 best_effort: bool = True, **_):
        self.format = format
        self.best_effort = best_effort

    def process_batch(self, batch, rt):
        from bento_ray.logparse import LogParseError, parse_log

        for m in batch:
            try:
                doc = parse_log(
                    m.content_bytes().decode("utf-8", "replace"),
                    self.format)
                m._structured = doc
                m._parsed = True
                m.raw = None
            except (LogParseError, ValueError) as e:
                if not self.best_effort:
                    m.error = str(e)
        return [batch]


class GrokProcessor(Processor):
    name = "grok"

    def __init__(self, expressions: list | str, **_):
        from bento_ray.stages.parsers import compile_grok

        exprs = expressions if isinstance(expressions, list) \
            else [expressions]
        self.rx = [compile_grok(e) for e in exprs]

    def process_batch(self, batch, rt):
        for m in batch:
            s = m.content_bytes().decode("utf-8", "replace")
            for rx in self.rx:
                mt = rx.search(s)
                if mt:
                    m._structured = {k: v for k, v in
                                     mt.groupdict().items()
                                     if v is not None}
                    m._parsed = True
                    m.raw = None
                    break
            else:
                m.error = "grok patterns did not match payload"
        return [batch]


class CompressProcessor(Processor):
    name = "compress"

    def __init__(self, algorithm: str = "gzip", level: int = -1):
        self.algorithm = algorithm
        self.level = level

    def process_batch(self, batch, rt):
        from bento_ray.blobl.methods import m_compress

        for m in batch:
            m.raw = m_compress(m.content_bytes(), self.algorithm,
                               self.level)
            m._structured = None
            m._parsed = False
        return [batch]


class DecompressProcessor(Processor):
    name = "decompress"

    def __init__(self, algorithm: str = "gzip"):
        self.algorithm = algorithm

    def process_batch(self, batch, rt):
        from bento_ray.blobl.methods import m_decompress
        from bento_ray.blobl.values import BloblangError

        for m in batch:
            try:
                m.raw = m_decompress(m.content_bytes(), self.algorithm)
                m._structured = None
                m._parsed = False
            except (BloblangError, Exception) as e:  # noqa: BLE001
                m.error = str(e)
        return [batch]


class InsertPartProcessor(Processor):
    name = "insert_part"

    def __init__(self, content: str, index: int = -1):
        self.content = InterpolatedField(content)
        self.index = index

    def process_batch(self, batch, rt):
        new = Message.from_content(
            self.content.resolve_message(0, batch, rt.env, rt.counters)
            if batch else self.content.template)
        idx = self.index if self.index >= 0 else len(batch) + self.index + 1
        out = list(batch)
        out.insert(max(0, min(idx, len(out))), new)
        return [out]


class AWKProcessor(Processor):
    """``awk`` (internal/impl/awk/processor.go): run an AWK program
    (awklang.py subset + the bento custom function set) per message;
    printed output replaces the content, json_set* mutations re-marshal
    the payload, metadata_set updates metadata."""

    name = "awk"

    def __init__(self, program: str, codec: str = "text"):
        from bento_ray.awklang import AWK

        self.prog = AWK(program, codec=codec)

    def process_batch(self, batch, rt):
        from bento_ray.awklang import AWKError

        for m in batch:
            try:
                content, meta, _doc = self.prog.run_message(
                    m.content_bytes(), m.meta)
                m.raw = content
                m._structured = None
                m._parsed = False
                m.meta = meta
            except (AWKError, ValueError, TypeError, KeyError,
                    ZeroDivisionError) as e:
                m.error = str(e)
        return [batch]


class ProtobufProcessor(Processor):
    """``protobuf`` (processor_protobuf.go): operators ``from_json``
    (JSON → binary protobuf payload) and ``to_json`` (binary → JSON),
    with schemas compiled at runtime from ``import_paths``
    (protoschema.py — no protoc in this sandbox)."""

    name = "protobuf"

    def __init__(self, operator: str, message: str,
                 import_paths: list[str], base_dir: str | None = None):
        from bento_ray.protoschema import SchemaSet

        roots = []
        for p in import_paths:
            cands = [p]
            if base_dir:
                cands.append(os.path.join(base_dir, p))
                # configs reference paths from the repo root — walk up
                d = base_dir
                for _ in range(6):
                    d = os.path.dirname(d)
                    if d:
                        cands.append(os.path.join(d, p))
            for c in cands:
                if os.path.isdir(c):
                    roots.append(c)
                    break
            else:
                raise ValueError(f"import path {p!r} not found")
        self.schemas = SchemaSet(roots)
        self.cls = self.schemas.message_class(message)
        self.operator = operator

    def process_batch(self, batch, rt):
        from google.protobuf import json_format
        from google.protobuf.message import DecodeError

        for m in batch:
            try:
                if self.operator == "from_json":
                    msg = json_format.Parse(
                        m.content_bytes().decode("utf-8"), self.cls())
                    m.raw = msg.SerializeToString()
                    m._structured = None
                    m._parsed = False
                elif self.operator == "to_json":
                    msg = self.cls()
                    msg.ParseFromString(m.content_bytes())
                    m.raw = json_format.MessageToJson(
                        msg, indent=None).encode()
                    m._structured = None
                    m._parsed = False
                else:
                    raise ValueError(
                        f"unsupported protobuf operator {self.operator}")
            except (json_format.ParseError, DecodeError, ValueError) as e:
                import re as _re

                msg = str(e)
                # protojson parity: Go reports `unknown field "x"`;
                # python reports `has no field named "x"`
                um = _re.search(r'no field named "?([\w.]+)"?', msg)
                if um:
                    msg = f'unknown field "{um.group(1)}"'
                m.error = msg
        return [batch]


class AvroProcessor(Processor):
    """``avro`` (internal/impl/avro/processor.go): to_json / from_json
    between Avro (textual / binary / single encodings) and JSON, via
    the pure-Python codec in bento_ray/avroschema.py (no avro lib in
    this sandbox). Union values wrap goavro-style as
    ``{"<branch name>": value}``."""

    name = "avro"

    def __init__(self, operator: str, encoding: str = "textual",
                 schema: str = "", schema_path: str = "",
                 base_dir: str | None = None):
        from bento_ray.avroschema import AvroError, parse_schema

        if operator not in ("to_json", "from_json"):
            raise ValueError(f"operator not recognised: {operator}")
        if encoding not in ("textual", "binary", "single"):
            raise ValueError(f"encoding '{encoding}' not recognised")
        if schema_path:
            # processor.go:207-213: file:// or http:// only; http is
            # out of scope (no network in this sandbox)
            if not schema_path.startswith("file://"):
                raise ValueError(
                    "invalid schema_path provided, must start with "
                    "file:// or http://")
            import os

            path = schema_path[len("file://"):]
            if base_dir is not None and not os.path.isabs(path):
                path = os.path.join(base_dir, path)
            try:
                with open(path) as fh:
                    schema = fh.read()
            except OSError as e:
                raise ValueError(
                    f"failed to load Avro schema definition: {e}") from None
        if not schema:
            raise ValueError("a schema must be specified with either the "
                             "`schema` or `schema_path` fields")
        try:
            self.schema = parse_schema(schema)
        except AvroError as e:
            raise ValueError(f"failed to parse schema: {e}") from None
        self.operator = operator
        self.encoding = encoding

    def process_batch(self, batch, rt):
        from bento_ray import avroschema as av

        for m in batch:
            try:
                if self.operator == "to_json":
                    raw = m.content_bytes()
                    if self.encoding == "textual":
                        doc = av.decode_textual(self.schema, raw)
                    elif self.encoding == "binary":
                        doc = av.decode_binary(self.schema, raw)
                    else:
                        doc = av.decode_single(self.schema, raw)
                    m._structured = doc
                    m._parsed = True
                    m.raw = None
                else:
                    doc = m.structured()
                    native = av._from_avro_json(self.schema, doc)
                    if self.encoding == "textual":
                        m.raw = av.encode_textual(
                            self.schema, native).encode("utf-8")
                    elif self.encoding == "binary":
                        m.raw = av.encode_binary(self.schema, native)
                    else:
                        m.raw = av.encode_single(self.schema, native)
                    m._structured = None
                    m._parsed = False
            except av.AvroError as e:
                m.error = (f"failed to convert Avro document to JSON: {e}"
                           if self.operator == "to_json" else
                           f"failed to convert JSON to Avro schema: {e}")
        return [batch]


class OpenSnowcatProcessor(Processor):
    """``opensnowcat`` (internal/impl/opensnowcat/
    processor_opensnowcat.go): Snowplow enriched-TSV event processing
    — drop filters (column substrings + schema property paths),
    PII transforms (hash/redact/anonymize_ip), tsv or flattened-json
    output. Core logic in bento_ray.snowcat."""

    name = "opensnowcat"

    def __init__(self, output_format: str = "tsv",
                 filters: dict | None = None):
        from bento_ray.snowcat import OpenSnowcat

        f = filters or {}
        self.engine = OpenSnowcat(
            output_format=output_format,
            drop=f.get("drop"),
            transform=f.get("transform"))

    def process_batch(self, batch, rt):
        from bento_ray.snowcat import SnowcatError

        out = []
        for m in batch:
            try:
                res = self.engine.process(
                    m.content_bytes().decode("utf-8", "replace"))
            except SnowcatError as e:
                m.error = str(e)
                out.append(m)
                continue
            if res is None:
                rt.counters["opensnowcat.dropped"] = \
                    rt.counters.get("opensnowcat.dropped", 0) + 1
                continue  # event dropped by filter
            if isinstance(res, dict):
                m._structured = res
                m._parsed = True
                m.raw = None
            else:
                m.raw = res.encode()
                m._structured = None
                m._parsed = False
            out.append(m)
        return [out]


class MsgpackProcessor(Processor):
    """``msgpack`` (internal/impl/msgpack/processor.go): to_json /
    from_json between MessagePack and JSON payloads."""

    name = "msgpack"

    def __init__(self, operator: str):
        if operator not in ("to_json", "from_json"):
            raise ValueError(f"operator not recognised: {operator}")
        self.operator = operator

    def process_batch(self, batch, rt):
        import msgpack

        for m in batch:
            try:
                if self.operator == "to_json":
                    doc = msgpack.unpackb(m.content_bytes(), raw=False)
                    m._structured = doc
                    m._parsed = True
                    m.raw = None
                else:
                    m.raw = msgpack.packb(m.structured(),
                                          use_bin_type=True)
                    m._structured = None
                    m._parsed = False
            except Exception as e:  # noqa: BLE001
                m.error = str(e)
        return [batch]


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


class CommandProcessor(Processor):
    """``command`` (internal/impl/io/processor_command.go:24): execute
    a command per message — stdin is the raw message bytes, stdout
    replaces the content. Non-zero exit sets the whole stderr (or a
    generic message) as the message error and leaves the content
    unchanged; stderr alongside a zero exit lands in the
    ``command_stderr`` metadata field. ``name`` is interpolated;
    ``args_mapping`` is a Bloblang expression resolving to an argv
    array. One process per message — high-throughput streams should
    use ``subprocess`` instead, exactly like the reference advises."""

    name = "command"

    def __init__(self, name: str = "", args_mapping: str | None = None,
                 timeout: float = 60.0):
        self.cmd_name = InterpolatedField(name)
        self.args_mapping = None
        if args_mapping:
            src = args_mapping
            try:
                self.args_mapping = Mapping(src)
            except Exception:
                # FieldBloblang accepts bare query expressions
                # ('this.args', '[ "-c", this.path ]') — wrap them
                self.args_mapping = Mapping(f"root = ({src})")
        self.timeout = timeout

    def _argv(self, i: int, batch, rt) -> list[str]:
        name = self.cmd_name.resolve_message(i, batch, rt.env,
                                             rt.counters)
        args: list[str] = []
        if self.args_mapping is not None:
            res = self.args_mapping.run_batch(
                [batch[i]], env=rt.env, on_error="raise")
            val = res[0].structured() if res else None
            if not isinstance(val, list):
                raise BloblangError(
                    f"args mapping result error: expected array, got "
                    f"{type(val).__name__}")
            from bento_ray.blobl.methods import _ito_string

            args = [_ito_string(v) for v in val]
        return [name, *args]

    def process_batch(self, batch, rt):
        import subprocess as _sp

        for i, m in enumerate(batch):
            try:
                argv = self._argv(i, batch, rt)
            except BloblangError as e:
                m.error = f"args mapping error: {e}"
                continue
            try:
                res = _sp.run(argv, input=m.content_bytes(),
                              capture_output=True, timeout=self.timeout)
            except (OSError, _sp.TimeoutExpired) as e:
                m.error = f"execution error: {e}"
                continue
            if res.returncode != 0:
                err = res.stderr.decode("utf-8", "replace") or \
                    f"exit status {res.returncode}"
                m.error = f"execution error: {err}"
                continue
            m.raw = res.stdout
            m._structured = None
            m._parsed = False
            if res.stderr:
                m.meta["command_stderr"] = res.stderr.decode(
                    "utf-8", "replace")
        return [batch]


def _netstring_encode(b: bytes) -> bytes:
    return str(len(b)).encode() + b":" + b + b","


class _SubprocHandle:
    """One persistent child process with framed stdin/stdout codecs
    (processor_subprocess.go:227 subprocWrapper): restarted on exit,
    stderr drained to a bounded buffer."""

    def __init__(self, argv: list[str]):
        self.argv = argv
        self.proc = None

    def start(self):
        import subprocess as _sp

        self.proc = _sp.Popen(self.argv, stdin=_sp.PIPE, stdout=_sp.PIPE,
                              stderr=_sp.DEVNULL, bufsize=0)

    def ensure(self):
        if self.proc is None or self.proc.poll() is not None:
            self.start()

    def stop(self):
        if self.proc is not None and self.proc.poll() is None:
            self.proc.kill()
            self.proc.wait()
        self.proc = None

    # -- framed request/response ------------------------------------
    def roundtrip(self, payload: bytes, codec_send: str,
                  codec_recv: str) -> bytes:
        self.ensure()
        p = self.proc
        if codec_send == "lines":
            p.stdin.write(payload + b"\n")
        elif codec_send == "length_prefixed_uint32_be":
            import struct as _st

            p.stdin.write(_st.pack(">I", len(payload)) + payload)
        elif codec_send == "netstring":
            p.stdin.write(_netstring_encode(payload))
        else:
            raise ValueError(f"unrecognized codec_send value: "
                             f"{codec_send}")
        p.stdin.flush()
        return self._read_one(codec_recv)

    def _read_exact(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self.proc.stdout.read(n - len(out))
            if not chunk:
                raise OSError("subprocess exited mid-response")
            out += chunk
        return out

    def _read_one(self, codec_recv: str) -> bytes:
        p = self.proc
        if codec_recv == "lines":
            line = p.stdout.readline()
            if not line:
                raise OSError("subprocess exited mid-response")
            return line.rstrip(b"\r\n")
        if codec_recv == "length_prefixed_uint32_be":
            import struct as _st

            ln = _st.unpack(">I", self._read_exact(4))[0]
            return self._read_exact(ln)
        if codec_recv == "netstring":
            digits = b""
            while True:
                c = self._read_exact(1)
                if c == b":":
                    break
                if not c.isdigit() or len(digits) > 18:
                    raise OSError("encountered invalid netstring")
                digits += c
            if not digits:
                raise OSError("encountered invalid netstring: empty "
                              "length")
            body = self._read_exact(int(digits))
            if self._read_exact(1) != b",":
                raise OSError("encountered invalid netstring: trailing "
                              "comma-character is missing")
            return body
        raise ValueError(f"invalid codec_recv option: {codec_recv}")


class SubprocessProcessor(Processor):
    """``subprocess`` (internal/impl/io/processor_subprocess.go:48):
    keep one child process alive and pipe each message through it via
    framed stdin/stdout codecs. With the default ``lines`` codecs a
    multi-line message is fed line-by-line and the per-line responses
    re-join with newlines (getSendSubprocessorFunc, :184-202); the
    child is restarted if it exits. Errors set the message error. Per
    actor this is ONE long-lived child — the Ray actor pool supplies
    the parallelism."""

    name = "subprocess"

    def __init__(self, name: str = "", args: list | None = None,
                 max_buffer: int = 65536, codec_send: str = "lines",
                 codec_recv: str = "lines"):
        if codec_send not in ("lines", "length_prefixed_uint32_be",
                              "netstring"):
            raise ValueError(f"unrecognized codec_send value: "
                             f"{codec_send}")
        if codec_recv not in ("lines", "length_prefixed_uint32_be",
                              "netstring"):
            raise ValueError(f"invalid codec_recv option: {codec_recv}")
        self.handle = _SubprocHandle([name, *[str(a) for a in
                                              (args or [])]])
        self.codec_send = codec_send
        self.codec_recv = codec_recv
        self.max_buffer = max_buffer

    def process_batch(self, batch, rt):
        for m in batch:
            content = m.content_bytes()
            try:
                if self.codec_send == "lines":
                    parts = content.split(b"\n")
                    res = [self.handle.roundtrip(seg, "lines",
                                                 self.codec_recv)
                           for seg in parts]
                    out = b"\n".join(res)
                else:
                    out = self.handle.roundtrip(content, self.codec_send,
                                                self.codec_recv)
            except (OSError, ValueError) as e:
                self.handle.stop()
                m.error = str(e)
                continue
            m.raw = out
            m._structured = None
            m._parsed = False
        return [batch]

    def __del__(self):  # actor teardown
        try:
            self.handle.stop()
        except Exception:
            pass


class SelectPartsProcessor(Processor):
    name = "select_parts"

    def __init__(self, parts):
        self.parts = parts

    def process_batch(self, batch, rt):
        n = len(batch)
        out = [batch[p] for p in self.parts if -n <= p < n]
        return [out] if out else []


class JavascriptProcessor(Processor):
    """``javascript`` (internal/impl/javascript/processor.go:29 +
    vm.go + functions.go): runs an ES5-subset program
    (:mod:`bento_ray.jslang` ≈ goja) once per message with the
    ``bento.v0_*`` host functions bound to the target message, plus a
    nodejs-style ``require()`` resolving ``<name>.js`` from
    ``global_folders``.

    Parity notes (vm.go:60-66, 123-143): host-function failures are
    thrown into JS as plain STRING values, so ``catch (e)`` observes
    the error text; an UNCAUGHT error fails the whole batch (the
    reference's ProcessBatch returns the error — here every message of
    the batch is flagged, the engine's batch-error convention);
    ``v0_msg_as_structured`` hands the script a deep copy, mirroring
    goja's export-into-JS-values (TestProcessorStructuredImut).
    ``v0_fetch`` has no network in this runtime and throws unless a
    ``fetch_fn(url, headers, method, body) -> {"status","body"}`` hook
    is injected (tests inject one; processor_http.go is likewise
    mockable-only here)."""

    name = "javascript"

    def __init__(self, code: str = "", file: str = "",
                 global_folders=(), base_dir: str | None = None,
                 fetch_fn=None):
        from bento_ray import jslang

        if not code and not file:
            raise ValueError(
                "either a `code` or `file` must be specified")
        if file:
            path = file if os.path.isabs(file) or base_dir is None \
                else os.path.join(base_dir, file)
            with open(path, "r", encoding="utf-8") as f:
                code = f.read()
        self.program = jslang.compile_js(code)
        self.global_folders = [
            g if os.path.isabs(g) or base_dir is None
            else os.path.join(base_dir, g) for g in global_folders]
        self.fetch_fn = fetch_fn
        self._module_cache: dict[str, object] = {}
        self._target: list = [None]          # current message holder
        self.interp = jslang.Interp(host={
            "bento": self._bento_object(),
            "require": jslang.NativeFunction("require", self._require),
        })

    # -- host functions (functions.go:88-255) --------------------------

    def _bento_object(self):
        from bento_ray.jslang import NativeFunction

        fns = {
            "v0_msg_as_string": self._as_string,
            "v0_msg_set_string": self._set_string,
            "v0_msg_as_structured": self._as_structured,
            "v0_msg_set_structured": self._set_structured,
            "v0_msg_exists_meta": self._exists_meta,
            "v0_msg_get_meta": self._get_meta,
            "v0_msg_set_meta": self._set_meta,
            "v0_fetch": self._fetch,
        }
        return {name: NativeFunction(name, fn)
                for name, fn in fns.items()}

    @staticmethod
    def _parse_args(args, n_required):
        """parseArgs parity (vm.go:72-85): undefined args error."""
        from bento_ray.jslang import JSThrow, UNDEFINED

        for i, a in enumerate(args):
            if a is UNDEFINED:
                raise JSThrow(
                    f"argument at position {i} is undefined")
        if len(args) < n_required:
            raise JSThrow(
                f"have {len(args)} arguments, but "
                f"{n_required} are required")

    @staticmethod
    def _to_structured(v):
        """JS value → message value (goja Export): undefined → null."""
        from bento_ray.jslang import UNDEFINED

        if v is UNDEFINED:
            return None
        if isinstance(v, list):
            return [JavascriptProcessor._to_structured(x) for x in v]
        if isinstance(v, dict):
            return {k: JavascriptProcessor._to_structured(x)
                    for k, x in v.items() if k != "__is_error__"}
        return v

    def _as_string(self, args):
        m = self._target[0]
        b = m.content_bytes()
        return b.decode("utf-8", errors="replace")

    def _set_string(self, args):
        from bento_ray.jslang import UNDEFINED, to_string

        self._parse_args(args, 1)
        m = self._target[0]
        m.raw = to_string(args[0])
        m._structured = None
        m._parsed = False
        return UNDEFINED

    def _as_structured(self, args):
        import copy

        from bento_ray.jslang import JSThrow

        m = self._target[0]
        try:
            return copy.deepcopy(m.structured())
        except BloblangError as e:
            raise JSThrow(str(e))

    def _set_structured(self, args):
        from bento_ray.jslang import UNDEFINED

        self._parse_args(args, 1)
        m = self._target[0]
        m._structured = self._to_structured(args[0])
        m._parsed = True
        m.raw = None
        return UNDEFINED

    def _exists_meta(self, args):
        from bento_ray.jslang import to_string

        self._parse_args(args, 1)
        return to_string(args[0]) in self._target[0].meta

    def _get_meta(self, args):
        from bento_ray.jslang import JSThrow, to_string

        self._parse_args(args, 1)
        key = to_string(args[0])
        try:
            return self._target[0].meta[key]
        except KeyError:
            raise JSThrow("key not found")

    def _set_meta(self, args):
        from bento_ray.jslang import UNDEFINED, to_string

        self._parse_args(args, 2)
        self._target[0].meta[to_string(args[0])] = \
            self._to_structured(args[1])
        return UNDEFINED

    def _fetch(self, args):
        from bento_ray.jslang import JSThrow, to_string

        self._parse_args(args, 1)
        if self.fetch_fn is None:
            raise JSThrow(
                "v0_fetch: network disabled in this runtime")
        url = to_string(args[0])
        headers = args[1] if len(args) > 1 and isinstance(
            args[1], dict) else {}
        method = to_string(args[2]) if len(args) > 2 else "GET"
        body = to_string(args[3]) if len(args) > 3 else ""
        return self.fetch_fn(url, headers, method, body)

    def _require(self, args):
        """nodejs-style require (processor.go:127-158 sourceLoader +
        goja_nodejs require): resolve ``<name>.js`` from
        global_folders, execute once with ``module.exports``."""
        from bento_ray import jslang
        from bento_ray.jslang import JSThrow, Scope, to_string

        self._parse_args(args, 1)
        name = to_string(args[0])
        fname = name if name.endswith(".js") else name + ".js"
        for folder in self.global_folders:
            path = os.path.join(folder, fname)
            if os.path.isfile(path):
                break
        else:
            raise JSThrow(f"module {name!r} was not found")
        path = os.path.abspath(path)
        if path in self._module_cache:
            return self._module_cache[path]
        with open(path, "r", encoding="utf-8") as f:
            src = f.read()
        module = {"exports": {}}
        scope = Scope(self.interp.globals, is_function=True)
        scope.declare("module", module, "let")
        scope.declare("exports", module["exports"], "let")
        self.interp.run(jslang.compile_js(src), scope)
        self._module_cache[path] = module["exports"]
        return module["exports"]

    # -- batch loop (vm.go:123-143) -------------------------------------

    def process_batch(self, batch, rt):
        from bento_ray.jslang import JSError, JSThrow, Scope, to_string

        for m in batch:
            self._target[0] = m
            try:
                self.interp.run(self.program,
                                Scope(self.interp.globals,
                                      is_function=True))
            except JSThrow as e:
                for mm in batch:
                    mm.error = to_string(e.value)
                break
            except (JSError, RecursionError) as e:
                for mm in batch:
                    mm.error = str(e)
                break
            finally:
                self._target[0] = None
        return [batch]


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


_BASE_DIR: list[str] = []


def set_config_base_dir(d: str | None):
    """Set the directory relative paths in processor configs resolve
    against (the config file's directory); used by the test runner."""
    _BASE_DIR.clear()
    if d:
        _BASE_DIR.append(d)


# every kind _build_by_kind dispatches — the builder's from_spec uses
# this to route config-registry processors through the dataset bridge
# (bento_ray.config.stage)
CONFIG_PROCESSOR_KINDS = frozenset({
    "mapping", "bloblang", "mutation", "dedupe", "split", "archive",
    "unarchive", "protobuf", "msgpack", "avro", "awk", "xml", "switch",
    "branch", "try", "catch", "retry", "for_each", "while", "cache",
    "sleep", "metric", "group_by_value", "bounds_check", "parse_log",
    "grok", "compress", "decompress", "insert_part", "jq", "jmespath",
    "noop", "log", "select_parts", "http", "javascript", "command",
    "subprocess", "opensnowcat", "wasm",
})


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
        return ArchiveProcessor(format=cfg.get("format", "json_array"),
                                path=cfg.get("path", ""))
    if kind == "unarchive":
        return UnarchiveProcessor(format=cfg.get("format", "json_array"))
    if kind == "protobuf":
        return ProtobufProcessor(
            operator=cfg["operator"], message=cfg["message"],
            import_paths=cfg.get("import_paths", []),
            base_dir=_BASE_DIR[0] if _BASE_DIR else None)
    if kind == "msgpack":
        return MsgpackProcessor(operator=cfg["operator"])
    if kind == "opensnowcat":
        return OpenSnowcatProcessor(
            output_format=(cfg or {}).get("output_format", "tsv"),
            filters=(cfg or {}).get("filters"))
    if kind == "avro":
        return AvroProcessor(
            operator=cfg["operator"],
            encoding=cfg.get("encoding", "textual"),
            schema=cfg.get("schema", ""),
            schema_path=cfg.get("schema_path", ""),
            base_dir=_BASE_DIR[0] if _BASE_DIR else None)
    if kind == "awk":
        return AWKProcessor(program=cfg["program"],
                            codec=cfg.get("codec", "text"))
    if kind == "xml":
        return XMLProcessor(operator=cfg.get("operator", "to_json"),
                            cast=cfg.get("cast", False))
    if kind == "switch":
        return SwitchProcessor(cfg if isinstance(cfg, list) else
                               cfg.get("cases", []), resources)
    if kind == "branch":
        return BranchProcessor(
            request_map=cfg.get("request_map", "root = this"),
            processors=cfg.get("processors", []),
            result_map=cfg.get("result_map", "root = this"),
            resources=resources)
    if kind == "try":
        return TryProcessor(cfg if isinstance(cfg, list) else
                            cfg.get("processors", []), resources)
    if kind == "catch":
        return CatchProcessor(cfg if isinstance(cfg, list) else
                              cfg.get("processors", []), resources)
    if kind == "retry":
        return RetryProcessor(processors=cfg.get("processors", []),
                              max_retries=cfg.get("max_retries", 3),
                              backoff=cfg.get("backoff"),
                              resources=resources)
    if kind == "for_each":
        return ForEachProcessor(cfg if isinstance(cfg, list) else
                                cfg.get("processors", []), resources)
    if kind == "while":
        return WhileProcessor(check=cfg.get("check", "false"),
                              processors=cfg.get("processors", []),
                              max_loops=cfg.get("max_loops", 100),
                              at_least_once=cfg.get("at_least_once",
                                                    False),
                              resources=resources)
    if kind == "cache":
        return CacheProcessor(resource=cfg["resource"],
                              operator=cfg["operator"], key=cfg["key"],
                              value=cfg.get("value", ""))
    if kind == "sleep":
        return SleepProcessor(duration=cfg.get("duration", "0s"))
    if kind == "metric":
        return MetricProcessor(**(cfg or {}))
    if kind == "group_by_value":
        return GroupByValueProcessor(value=cfg["value"])
    if kind == "bounds_check":
        return BoundsCheckProcessor(**(cfg or {}))
    if kind == "parse_log":
        return ParseLogProcessor(**(cfg or {}))
    if kind == "grok":
        return GrokProcessor(**(cfg or {}))
    if kind == "compress":
        return CompressProcessor(**(cfg or {}))
    if kind == "decompress":
        return DecompressProcessor(**(cfg or {}))
    if kind == "insert_part":
        return InsertPartProcessor(**(cfg or {}))
    if kind == "jq":
        return JQProcessor(query=cfg["query"],
                           output_raw=cfg.get("output_raw", False),
                           raw=cfg.get("raw", False))
    if kind == "jmespath":
        return JMESPathProcessor(query=cfg["query"])
    if kind == "noop":
        return NoopProcessor()
    if kind == "command":
        return CommandProcessor(**(cfg or {}))
    if kind == "subprocess":
        return SubprocessProcessor(**(cfg or {}))
    if kind == "log":
        return LogProcessor(**(cfg or {}))
    if kind == "select_parts":
        return SelectPartsProcessor(parts=cfg.get("parts", [0]))
    if kind == "http":
        return HTTPProcessor(**(cfg or {}))
    if kind == "wasm":
        from bento_ray.wasmproc import WasmProcessor

        return WasmProcessor(**(cfg or {}))
    if kind == "javascript":
        return JavascriptProcessor(
            code=cfg.get("code", ""), file=cfg.get("file", ""),
            global_folders=cfg.get("global_folders", []),
            base_dir=_BASE_DIR[0] if _BASE_DIR else None)
    # registered config templates act as first-class processor kinds:
    # render the Bloblang macro with this config, then build whatever
    # real component the mapping produced (template.go Render)
    from bento_ray.config.template import lookup_template

    tmpl = lookup_template("processor", kind)
    if tmpl is not None:
        rendered = tmpl.render(cfg or {})
        if not isinstance(rendered, dict) or len(rendered) != 1:
            raise ValueError(
                f"template {kind}: mapping must produce exactly one "
                f"component config, got {type(rendered).__name__}")
        return build_processor(rendered, resources)
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
