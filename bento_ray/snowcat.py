"""OpenSnowcat / Snowplow enriched-TSV event processing for the
``opensnowcat`` processor (reference:
internal/impl/opensnowcat/processor_opensnowcat.go).

The 131-column enriched-TSV layout and the per-column type model are
the public Snowplow canonical-event spec (the reference links
docs.snowplow.io's "understanding the enriched TSV format"); the JSON
conversion mirrors the Snowplow analytics SDK's ParseEvent→ToMap:

- empty columns are omitted;
- int/double/boolean columns parse to native types ('0'/'1' bools);
- ``*_tstamp`` columns ('2006-01-02 15:04:05.999' UTC) render as Go
  RFC3339Nano strings (trailing zeros trimmed);
- ``contexts`` / ``derived_contexts`` self-describing JSON flattens to
  ``contexts_<vendor>_<name>_<major>`` keys holding LISTS of data
  objects (underscored, snake_cased, lowercased — SDK fixSchema);
- ``unstruct_event`` flattens to ``unstruct_event_<...>_<major>``
  holding the data object directly.

Filtering/transforms mirror the processor: drop filters are
case-insensitive substring matches over TSV columns or schema property
paths searched across contexts/derived_contexts/unstruct_event; field
transforms are salted hex digests (MD5/SHA-1/SHA-256/384/512), fixed
redaction, and IPv4-octet / IPv6-segment masking with 'x'.
"""

from __future__ import annotations

import hashlib
import json
import re
from datetime import datetime, timezone

from bento_ray.util import rfc3339nano

__all__ = ["COLUMNS", "parse_enriched_event", "OpenSnowcat",
           "snowcat_stage"]

# processor_opensnowcat.go:29-63 (public spec ordering, lowercase)
COLUMNS = [
    "app_id", "platform", "etl_tstamp", "collector_tstamp",
    "dvce_created_tstamp", "event", "event_id", "txn_id",
    "name_tracker", "v_tracker", "v_collector", "v_etl", "user_id",
    "user_ipaddress", "user_fingerprint", "domain_userid",
    "domain_sessionidx", "network_userid", "geo_country", "geo_region",
    "geo_city", "geo_zipcode", "geo_latitude", "geo_longitude",
    "geo_region_name", "ip_isp", "ip_organization", "ip_domain",
    "ip_netspeed", "page_url", "page_title", "page_referrer",
    "page_urlscheme", "page_urlhost", "page_urlport", "page_urlpath",
    "page_urlquery", "page_urlfragment", "refr_urlscheme",
    "refr_urlhost", "refr_urlport", "refr_urlpath", "refr_urlquery",
    "refr_urlfragment", "refr_medium", "refr_source", "refr_term",
    "mkt_medium", "mkt_source", "mkt_term", "mkt_content",
    "mkt_campaign", "contexts", "se_category", "se_action", "se_label",
    "se_property", "se_value", "unstruct_event", "tr_orderid",
    "tr_affiliation", "tr_total", "tr_tax", "tr_shipping", "tr_city",
    "tr_state", "tr_country", "ti_orderid", "ti_sku", "ti_name",
    "ti_category", "ti_price", "ti_quantity", "pp_xoffset_min",
    "pp_xoffset_max", "pp_yoffset_min", "pp_yoffset_max", "useragent",
    "br_name", "br_family", "br_version", "br_type", "br_renderengine",
    "br_lang", "br_features_pdf", "br_features_flash",
    "br_features_java", "br_features_director", "br_features_quicktime",
    "br_features_realplayer", "br_features_windowsmedia",
    "br_features_gears", "br_features_silverlight", "br_cookies",
    "br_colordepth", "br_viewwidth", "br_viewheight", "os_name",
    "os_family", "os_manufacturer", "os_timezone", "dvce_type",
    "dvce_ismobile", "dvce_screenwidth", "dvce_screenheight",
    "doc_charset", "doc_width", "doc_height", "tr_currency",
    "tr_total_base", "tr_tax_base", "tr_shipping_base", "ti_currency",
    "ti_price_base", "base_currency", "geo_timezone", "mkt_clickid",
    "mkt_network", "etl_tags", "dvce_sent_tstamp", "refr_domain_userid",
    "refr_dvce_tstamp", "derived_contexts", "domain_sessionid",
    "derived_tstamp", "event_vendor", "event_name", "event_format",
    "event_version", "event_fingerprint", "true_tstamp",
]

_COL_INDEX = {c: i for i, c in enumerate(COLUMNS)}

_TSTAMP = {c for c in COLUMNS if c.endswith("_tstamp")}
_INT = {"txn_id", "domain_sessionidx", "page_urlport", "refr_urlport",
        "ti_quantity", "pp_xoffset_min", "pp_xoffset_max",
        "pp_yoffset_min", "pp_yoffset_max", "br_viewwidth",
        "br_viewheight", "dvce_screenwidth", "dvce_screenheight",
        "doc_width", "doc_height"}
_DOUBLE = {"geo_latitude", "geo_longitude", "se_value", "tr_total",
           "tr_tax", "tr_shipping", "ti_price", "tr_total_base",
           "tr_tax_base", "tr_shipping_base", "ti_price_base"}
_BOOL = {c for c in COLUMNS if c.startswith("br_features_")} | {
    "br_cookies", "dvce_ismobile"}
_JSON_FIELDS = ("contexts", "derived_contexts", "unstruct_event")

_CAMEL_RE = re.compile(r"([a-z0-9])([A-Z])")
_IGLU_RE = re.compile(r"^iglu:([^/]+)/([^/]+)/[^/]+/(\d+)")


class SnowcatError(ValueError):
    pass


def _fix_schema_key(prefix: str, schema_uri: str) -> str | None:
    m = _IGLU_RE.match(schema_uri)
    if not m:
        return None
    vendor, name, major = m.groups()
    fix = lambda s: _CAMEL_RE.sub(r"\1_\2", s).replace(".", "_") \
        .replace("-", "_").lower()
    return f"{prefix}_{fix(vendor)}_{fix(name)}_{major}"


def _parse_tstamp(v: str) -> str:
    fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in v else "%Y-%m-%d %H:%M:%S"
    dt = datetime.strptime(v, fmt).replace(tzinfo=timezone.utc)
    return rfc3339nano(int(dt.timestamp() * 1_000_000))


def parse_enriched_event(tsv: str) -> dict:
    """Enriched TSV line → flattened event map (SDK ToMap parity)."""
    cols = tsv.split("\t")
    if len(cols) != len(COLUMNS):
        raise SnowcatError(
            f"expected {len(COLUMNS)} fields, got {len(cols)}")
    out: dict = {}
    for name, raw in zip(COLUMNS, cols):
        if raw == "":
            continue
        try:
            if name in ("contexts", "derived_contexts"):
                doc = json.loads(raw)
                for elem in doc.get("data", []):
                    key = _fix_schema_key("contexts",
                                          elem.get("schema", ""))
                    if key is not None:
                        out.setdefault(key, []).append(
                            elem.get("data"))
            elif name == "unstruct_event":
                doc = json.loads(raw)
                inner = doc.get("data", {})
                key = _fix_schema_key("unstruct_event",
                                      inner.get("schema", ""))
                if key is not None:
                    out[key] = inner.get("data")
            elif name in _TSTAMP:
                out[name] = _parse_tstamp(raw)
            elif name in _INT:
                out[name] = int(raw)
            elif name in _DOUBLE:
                out[name] = float(raw)
            elif name in _BOOL:
                out[name] = raw == "1"
            else:
                out[name] = raw
        except (ValueError, AttributeError) as exc:
            raise SnowcatError(
                f"failed to parse OpenSnowcat event field "
                f"{name}: {exc}") from None
    return out


def _is_schema_path(field: str) -> bool:
    # processor_opensnowcat.go:349-355: dotted names are schema paths
    # unless they start with the geo./metrics./site. column prefixes
    return "." in field and not field.startswith(
        ("geo.", "metrics.", "site."))


_HASHERS = {"MD5": "md5", "SHA-1": "sha1", "SHA-256": "sha256",
            "SHA-384": "sha384", "SHA-512": "sha512"}


class OpenSnowcat:
    """Config-driven enriched-event engine: drop filters, field
    transforms, tsv/json output — the ``opensnowcat`` processor's
    core, reusable from map_batches stages."""

    def __init__(self, output_format: str = "tsv",
                 drop: dict | None = None,
                 transform: dict | None = None):
        if output_format not in ("tsv", "json"):
            raise SnowcatError(
                f"unknown output_format: {output_format}")
        self.output_format = output_format
        self.drop = {}
        for field, crit in (drop or {}).items():
            key = field if _is_schema_path(field) else field.lower()
            contains = [str(c) for c in
                        (crit or {}).get("contains", [])]
            if contains:
                self.drop[key] = contains
        t = transform or {}
        self.global_salt = t.get("salt", "")
        self.global_algo = t.get("hash_algo", "SHA-256")
        self.fields = {}
        for field, cfg in (t.get("fields") or {}).items():
            key = field if _is_schema_path(field) else field.lower()
            self.fields[key] = {
                "strategy": (cfg or {}).get("strategy", ""),
                "hash_algo": (cfg or {}).get("hash_algo", ""),
                "salt": (cfg or {}).get("salt", ""),
                "redact_value": (cfg or {}).get("redact_value",
                                                "[REDACTED]"),
                "anon_octets": int((cfg or {}).get("anon_octets", 2)),
                "anon_segments": int((cfg or {}).get("anon_segments",
                                                     4)),
            }

    # ------------------------------------------------------- filters

    def _schema_property(self, cols: list[str], path: str) -> str:
        for jf in _JSON_FIELDS:
            idx = _COL_INDEX[jf]
            if idx >= len(cols) or not cols[idx]:
                continue
            try:
                data = json.loads(cols[idx])
            except ValueError:
                continue
            val = self._search_schema(data, path)
            if val:
                return val
        return ""

    def _search_schema(self, data, path: str) -> str:
        if isinstance(data, dict):
            schema = data.get("schema")
            if isinstance(schema, str) and schema.startswith("iglu:"):
                m = _IGLU_RE.match(schema)
                if m:
                    full = f"{m.group(1)}.{m.group(2)}"
                    if path.startswith(full + "."):
                        prop = path[len(full) + 1:]
                        inner = data.get("data")
                        if isinstance(inner, dict):
                            got = self._nested(inner, prop)
                            if got:
                                return got
            for v in data.values():
                got = self._search_schema(v, path)
                if got:
                    return got
        elif isinstance(data, list):
            for item in data:
                got = self._search_schema(item, path)
                if got:
                    return got
        return ""

    @staticmethod
    def _nested(data: dict, path: str) -> str:
        cur = data
        for part in path.split("."):
            if isinstance(cur, dict):
                cur = cur.get(part)
            else:
                return ""
        if cur is None:
            return ""
        if isinstance(cur, bool):
            return "true" if cur else "false"
        return str(cur)

    def should_drop(self, cols: list[str]) -> bool:
        for field, contains in self.drop.items():
            if _is_schema_path(field):
                val = self._schema_property(cols, field)
                if val and any(c.lower() in val.lower()
                               for c in contains):
                    return True
                continue
            idx = _COL_INDEX.get(field)
            if idx is None or idx >= len(cols):
                continue
            val = cols[idx].lower()
            if any(c.lower() in val for c in contains):
                return True
        return False

    # ---------------------------------------------------- transforms

    def _hash(self, value: str, cfg: dict) -> str:
        salt = cfg["salt"] or self.global_salt
        algo = cfg["hash_algo"] or self.global_algo
        h = hashlib.new(_HASHERS.get(algo.upper(), "sha256"))
        h.update((value + salt).encode())
        return h.hexdigest()

    @staticmethod
    def _anon_ip(value: str, cfg: dict) -> str:
        if ":" in value:  # IPv6: mask last N non-empty segments
            n = cfg["anon_segments"]
            if n <= 0:
                return value
            parts = value.split(":")
            masked = 0
            for i in range(len(parts) - 1, -1, -1):
                if masked >= n:
                    break
                if parts[i] != "":
                    parts[i] = "x"
                    masked += 1
            return ":".join(parts)
        n = cfg["anon_octets"]
        if n <= 0:
            return value
        parts = value.split(".")
        if len(parts) != 4:
            return value
        for i in range(max(0, len(parts) - n), len(parts)):
            parts[i] = "x"
        return ".".join(parts)

    def apply_transforms(self, cols: list[str]) -> None:
        for field, cfg in self.fields.items():
            idx = _COL_INDEX.get(field)
            if idx is None or idx >= len(cols) or cols[idx] == "":
                continue
            strat = cfg["strategy"]
            if strat == "hash":
                cols[idx] = self._hash(cols[idx], cfg)
            elif strat == "redact":
                cols[idx] = cfg["redact_value"]
            elif strat == "anonymize_ip":
                cols[idx] = self._anon_ip(cols[idx], cfg)

    # ------------------------------------------------------- process

    def process(self, tsv: str):
        """One enriched-TSV event → None (dropped), transformed TSV
        string, or the flattened event map (json mode)."""
        cols = tsv.split("\t")
        if self.drop and self.should_drop(cols):
            return None
        if self.fields:
            self.apply_transforms(cols)
        joined = "\t".join(cols)
        if self.output_format == "tsv":
            return joined
        return parse_enriched_event(joined)


def snowcat_stage(ds, col: str = "content", output_format: str = "json",
                  drop: dict | None = None, transform: dict | None = None,
                  concurrency=(1, 8)):
    """Distributed bulk path for the ``opensnowcat`` processor: run the
    enriched-event engine over a Dataset column of TSV lines with an
    actor pool (filters/transforms compile once per actor in
    ``__init__``, not per batch).

    Output: ``json`` mode → one ``content`` column of flattened-event
    JSON strings (opaque docs keep the engine columnar without forcing
    a per-event schema union); ``tsv`` mode → transformed TSV lines.
    Dropped events shrink the batch — at 100 TB the drop filter is the
    point, and filtering inside the batch means dropped bytes never
    re-enter the object store."""
    import pyarrow as pa

    class _Stage:
        def __init__(self):
            from bento_ray.blobl.values import go_json_dumps

            self.engine = OpenSnowcat(output_format=output_format,
                                      drop=drop, transform=transform)
            self.dumps = go_json_dumps

        def __call__(self, t: pa.Table) -> pa.Table:
            vals = t.column(col).to_pylist()
            out = []
            for v in vals:
                if isinstance(v, bytes):
                    v = v.decode("utf-8", "replace")
                res = self.engine.process(v)
                if res is None:
                    continue
                out.append(self.dumps(res)
                           if isinstance(res, dict) else res)
            return pa.table({"content": pa.array(out, pa.string())})

    return ds.map_batches(_Stage, batch_format="pyarrow",
                          concurrency=concurrency)
