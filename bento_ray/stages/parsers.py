"""Parsing / validation / serde processors (SURVEY.md §2.3).

| reference processor | here |
|---|---|
| ``grok`` (processor_grok.go) | ``grok_stage`` (named-group regex → columns) |
| ``parse_log`` (processor_parse_log.go) | ``parse_log_stage`` (syslog-ish named patterns) |
| ``jsonschema`` (processor_jsonschema.go) | ``json_schema_stage`` (validate → err column) |
| ``parquet_decode/encode`` (impl/parquet) | ``parquet_decode`` / ``parquet_encode`` |
| ``compress``/``decompress`` | functions registry (``compress``/``decompress``) |

All stateless regex/schema compilation happens once per actor
(callable classes), never per batch.
"""

from __future__ import annotations

import io
import json
import re

import pyarrow as pa
import pyarrow.parquet as pq

from bento_ray.util import resolve_concurrency as _conc

# a pragmatic subset of the grok pattern library (public pattern names)
GROK_PATTERNS = {
    "WORD": r"\w+",
    "NUMBER": r"-?\d+(?:\.\d+)?",
    "INT": r"-?\d+",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
    "IPORHOST": r"[\w.\-]+",
    "USER": r"[\w.\-]+",
    "GREEDYDATA": r".*",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?:DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|TRACE)",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def compile_grok(pattern: str) -> re.Pattern:
    """Expand ``%{NAME:field}`` references into a named-group regex."""

    def sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        body = GROK_PATTERNS.get(name)
        if body is None:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        return f"(?P<{field}>{body})" if field else f"(?:{body})"

    return re.compile(_GROK_REF.sub(sub, pattern))


class GrokParser:
    """Actor stage: parse ``content_col`` with a grok expression; each
    named capture becomes a string column (null on no-match)."""

    def __init__(self, pattern: str, content_col: str = "content"):
        self.rx = compile_grok(pattern)
        self.col = content_col
        self.fields = sorted(self.rx.groupindex)

    def __call__(self, t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {f: [] for f in self.fields}
        for s in t.column(self.col).to_pylist():
            m = self.rx.search(s) if s is not None else None
            for f in self.fields:
                cols[f].append(m.group(f) if m else None)
        for f in self.fields:
            t = t.append_column(f, pa.array(cols[f], pa.string()))
        return t


def grok_stage(ds, pattern: str, content_col: str = "content",
               concurrency: int | None = None):
    return ds.map_batches(GrokParser, fn_constructor_args=(pattern, content_col),
                          batch_format="pyarrow", concurrency=_conc(concurrency))


# rfc3164-ish syslog line (USER stops before the "[pid]" bracket)
_SYSLOG = ("%{TIMESTAMP_ISO8601:ts} %{IPORHOST:host} %{USER:app}"
           r"(?:\[%{INT:pid}\])?: %{GREEDYDATA:message}")


def parse_log_stage(ds, fmt: str = "syslog_rfc3164", content_col: str = "content",
                    concurrency: int | None = None, best_effort: bool = True):
    """``parse_log`` (processor_parse_log.go:141-260): parse each line
    as syslog (rfc5424 or rfc3164, reference-exact field names) and
    replace ``content_col`` with the structured JSON document
    (Go-marshalled: sorted keys). Unparseable lines keep their original
    content with ``err`` set (best-effort contract).

    The simplified PRI-less syslog shape from round 1 remains available
    as ``fmt="syslog_plain"`` (grok-based, one column per field)."""
    if fmt == "syslog_plain":
        return grok_stage(ds, _SYSLOG, content_col, concurrency)
    if fmt not in ("syslog_rfc3164", "syslog_rfc5424"):
        raise ValueError(f"unsupported log format {fmt}")

    from bento_ray.blobl.values import go_json_dumps
    from bento_ray.logparse import LogParseError, parse_log

    def _f(t: pa.Table) -> pa.Table:
        parsed, errs = [], []
        for s in t.column(content_col).to_pylist():
            try:
                parsed.append(go_json_dumps(parse_log(s or "", fmt)))
                errs.append(None)
            except (LogParseError, ValueError) as e:
                if not best_effort:
                    raise  # strict mode: malformed input fails the run
                parsed.append(s)
                errs.append(str(e))
        pos = t.schema.get_field_index(content_col)
        t = t.set_column(pos, content_col, pa.array(parsed, pa.string()))
        if "err" in t.column_names:
            t = t.set_column(t.schema.get_field_index("err"), "err",
                             pa.array(errs, pa.string()))
        else:
            t = t.append_column("err", pa.array(errs, pa.string()))
        return t

    return ds.map_batches(_f, batch_format="pyarrow")


class JsonSchemaValidator:
    """Validate a JSON column against a (subset) JSON-schema: type
    checks, required properties, enum. Failures flag the ``err`` column
    (the reference's error-routing contract) rather than raising."""

    def __init__(self, schema: dict, content_col: str = "content"):
        self.schema = schema
        self.col = content_col

    def _check(self, value, schema) -> str | None:
        typ = schema.get("type")
        type_map = {"object": dict, "array": list, "string": str,
                    "integer": int, "number": (int, float),
                    "boolean": bool, "null": type(None)}
        if typ:
            if typ not in type_map:
                return f"unsupported schema type {typ!r}"
            ok = isinstance(value, type_map[typ])
            # bool subclasses int in Python; JSON schema does not
            if ok and typ in ("integer", "number") and \
                    isinstance(value, bool):
                ok = False
            if not ok:
                return f"expected {typ}, got {type(value).__name__}"
        if typ == "object":
            for req in schema.get("required", []):
                if req not in value:
                    return f"missing required property {req!r}"
            for k, sub in schema.get("properties", {}).items():
                if k in value:
                    err = self._check(value[k], sub)
                    if err:
                        return f"{k}: {err}"
        if "enum" in schema and value not in schema["enum"]:
            return f"{value!r} not in enum"
        return None

    def __call__(self, t: pa.Table) -> pa.Table:
        errs = []
        for s in t.column(self.col).to_pylist():
            try:
                errs.append(self._check(json.loads(s), self.schema))
            except Exception as exc:  # noqa: BLE001 — routed to err column
                errs.append(f"invalid json: {exc}")
        err_arr = pa.array(errs, pa.string())
        if "err" in t.column_names:
            return t.set_column(t.column_names.index("err"), "err", err_arr)
        return t.append_column("err", err_arr)


def json_schema_stage(ds, schema: dict, content_col: str = "content",
                      concurrency: int | None = None):
    return ds.map_batches(JsonSchemaValidator,
                          fn_constructor_args=(schema, content_col),
                          batch_format="pyarrow", concurrency=_conc(concurrency))


def parquet_encode(t: pa.Table) -> bytes:
    """Batch → parquet bytes (processor_encode.go:19)."""
    buf = io.BytesIO()
    pq.write_table(t, buf)
    return buf.getvalue()


def parquet_decode(payload: bytes) -> pa.Table:
    """Parquet bytes → batch (processor_decode.go:19)."""
    return pq.read_table(io.BytesIO(payload))
