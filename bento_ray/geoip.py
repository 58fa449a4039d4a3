"""geoip_* Bloblang methods (reference:
internal/impl/maxmind/bloblang_geoip.go): look an IP up in a MaxMind
database and return the record shaped exactly as the reference does —
the geoip2-golang result struct marshalled through JSON, i.e.
CamelCase Go field names with Go zero values for absent fields
(``""``, ``0``, ``false``, ``null`` maps/slices).

The struct schemas below mirror geoip2-golang's public City / Country
/ ASN / Enterprise / AnonymousIP / ConnectionType / Domain / ISP
types; unknown database keys are dropped, exactly as Go's fixed-struct
decoding drops them. Raw decoding lives in bento_ray.mmdb.
"""

from __future__ import annotations

from bento_ray.mmdb import MMDBError, MMDBReader

__all__ = ["GeoIPError", "geoip_lookup", "GEOIP_METHODS"]


class GeoIPError(ValueError):
    pass


# Leaf type markers: Go zero values for absent fields.
_STR, _UINT, _FLOAT, _BOOL, _MAP = "", 0, 0.0, False, None

_NAMES = {"names": ("Names", _MAP)}
_CITY_REC = {"geoname_id": ("GeoNameID", _UINT), **_NAMES}
_CONTINENT = {"code": ("Code", _STR),
              "geoname_id": ("GeoNameID", _UINT), **_NAMES}
_COUNTRY_REC = {"geoname_id": ("GeoNameID", _UINT),
                "is_in_european_union": ("IsInEuropeanUnion", _BOOL),
                "iso_code": ("IsoCode", _STR), **_NAMES}
_REPRESENTED = {**_COUNTRY_REC, "type": ("Type", _STR)}
_LOCATION = {"accuracy_radius": ("AccuracyRadius", _UINT),
             "latitude": ("Latitude", _FLOAT),
             "longitude": ("Longitude", _FLOAT),
             "metro_code": ("MetroCode", _UINT),
             "time_zone": ("TimeZone", _STR)}
_POSTAL = {"code": ("Code", _STR)}
_SUBDIV = {"geoname_id": ("GeoNameID", _UINT),
           "iso_code": ("IsoCode", _STR), **_NAMES}
_TRAITS_LITE = {"is_anonymous_proxy": ("IsAnonymousProxy", _BOOL),
                "is_satellite_provider": ("IsSatelliteProvider", _BOOL)}

CITY_SCHEMA = {
    "city": ("City", _CITY_REC),
    "continent": ("Continent", _CONTINENT),
    "country": ("Country", _COUNTRY_REC),
    "location": ("Location", _LOCATION),
    "postal": ("Postal", _POSTAL),
    "registered_country": ("RegisteredCountry", _COUNTRY_REC),
    "represented_country": ("RepresentedCountry", _REPRESENTED),
    "subdivisions": ("Subdivisions", [_SUBDIV]),
    "traits": ("Traits", _TRAITS_LITE),
}

COUNTRY_SCHEMA = {
    "continent": ("Continent", _CONTINENT),
    "country": ("Country", _COUNTRY_REC),
    "registered_country": ("RegisteredCountry", _COUNTRY_REC),
    "represented_country": ("RepresentedCountry", _REPRESENTED),
    "traits": ("Traits", _TRAITS_LITE),
}

ASN_SCHEMA = {
    "autonomous_system_number": ("AutonomousSystemNumber", _UINT),
    "autonomous_system_organization":
        ("AutonomousSystemOrganization", _STR),
}

_ENT_COUNTRY = {**_COUNTRY_REC, "confidence": ("Confidence", _UINT)}
_ENT_TRAITS = {
    "autonomous_system_number": ("AutonomousSystemNumber", _UINT),
    "autonomous_system_organization":
        ("AutonomousSystemOrganization", _STR),
    "connection_type": ("ConnectionType", _STR),
    "domain": ("Domain", _STR),
    "isp": ("ISP", _STR),
    "is_anonymous_proxy": ("IsAnonymousProxy", _BOOL),
    "is_legitimate_proxy": ("IsLegitimateProxy", _BOOL),
    "is_satellite_provider": ("IsSatelliteProvider", _BOOL),
    "mobile_country_code": ("MobileCountryCode", _STR),
    "mobile_network_code": ("MobileNetworkCode", _STR),
    "organization": ("Organization", _STR),
    "static_ip_score": ("StaticIPScore", _FLOAT),
    "user_type": ("UserType", _STR),
}

ENTERPRISE_SCHEMA = {
    "city": ("City", {**_CITY_REC, "confidence": ("Confidence", _UINT)}),
    "continent": ("Continent", _CONTINENT),
    "country": ("Country", _ENT_COUNTRY),
    "location": ("Location", _LOCATION),
    "postal": ("Postal", {**_POSTAL,
                          "confidence": ("Confidence", _UINT)}),
    "registered_country": ("RegisteredCountry", _ENT_COUNTRY),
    "represented_country": ("RepresentedCountry",
                            {**_ENT_COUNTRY, "type": ("Type", _STR)}),
    "subdivisions": ("Subdivisions",
                     [{**_SUBDIV, "confidence": ("Confidence", _UINT)}]),
    "traits": ("Traits", _ENT_TRAITS),
}

ANONYMOUS_IP_SCHEMA = {
    "is_anonymous": ("IsAnonymous", _BOOL),
    "is_anonymous_vpn": ("IsAnonymousVPN", _BOOL),
    "is_hosting_provider": ("IsHostingProvider", _BOOL),
    "is_public_proxy": ("IsPublicProxy", _BOOL),
    "is_residential_proxy": ("IsResidentialProxy", _BOOL),
    "is_tor_exit_node": ("IsTorExitNode", _BOOL),
}

CONNECTION_TYPE_SCHEMA = {"connection_type": ("ConnectionType", _STR)}
DOMAIN_SCHEMA = {"domain": ("Domain", _STR)}
ISP_SCHEMA = {
    "autonomous_system_number": ("AutonomousSystemNumber", _UINT),
    "autonomous_system_organization":
        ("AutonomousSystemOrganization", _STR),
    "isp": ("ISP", _STR),
    "mobile_country_code": ("MobileCountryCode", _STR),
    "mobile_network_code": ("MobileNetworkCode", _STR),
    "organization": ("Organization", _STR),
}

GEOIP_METHODS = {
    "geoip_city": CITY_SCHEMA,
    "geoip_country": COUNTRY_SCHEMA,
    "geoip_asn": ASN_SCHEMA,
    "geoip_enterprise": ENTERPRISE_SCHEMA,
    "geoip_anonymous_ip": ANONYMOUS_IP_SCHEMA,
    "geoip_connection_type": CONNECTION_TYPE_SCHEMA,
    "geoip_domain": DOMAIN_SCHEMA,
    "geoip_isp": ISP_SCHEMA,
}


def _shape(raw, schema):
    if isinstance(schema, dict):
        raw = raw if isinstance(raw, dict) else {}
        out = {}
        for mmdb_key, (go_name, sub) in schema.items():
            out[go_name] = _shape(raw.get(mmdb_key), sub)
        return out
    if isinstance(schema, list):  # slice of structs; Go nil → null
        if not isinstance(raw, list):
            return None
        return [_shape(item, schema[0]) for item in raw]
    # leaf: Go zero value when absent (None map stays null)
    if raw is None:
        return schema
    return raw


_READERS: dict[str, MMDBReader] = {}


def _reader(path: str) -> MMDBReader:
    r = _READERS.get(path)
    if r is None:
        r = _READERS[path] = MMDBReader(path)
    return r


def geoip_lookup(method: str, ip: str, path: str) -> dict:
    """Look ``ip`` up in the mmdb at ``path`` and shape the record as
    the named geoip_* method (geoip2-golang struct JSON form). Missing
    records shape to the zero-valued struct, like geoip2-golang."""
    schema = GEOIP_METHODS.get(method)
    if schema is None:
        raise GeoIPError(f"unknown geoip method: {method}")
    try:
        raw = _reader(path).lookup(ip)
    except ValueError as exc:  # bad IP or bad database
        raise GeoIPError(str(exc)) from None
    return _shape(raw, schema)


def geoip_stage(ds, ip_col: str, path: str, method: str = "geoip_city",
                out_col: str = "geo", concurrency=(1, 8)):
    """Distributed bulk path for the geoip_* methods: enrich a Dataset
    column of IP strings against a local .mmdb file with an actor pool
    — the reader (tree + data section) loads ONCE per actor in
    ``__init__``; per batch each lookup is a pure tree walk. The
    shaped records are emitted as JSON strings in ``out_col`` (opaque
    docs keep the stage columnar without a per-database schema union).

    At cluster scale the .mmdb file must be present on every node (it
    is a small static artifact — ship it via runtime_env or a shared
    mount); nothing is broadcast per batch."""
    import json as _json

    import pyarrow as pa

    class _Stage:
        def __init__(self):
            self.reader = MMDBReader(path)
            self.schema = GEOIP_METHODS[method]

        def __call__(self, t: pa.Table) -> pa.Table:
            ips = t.column(ip_col).to_pylist()
            out = []
            for ip in ips:
                try:
                    raw = self.reader.lookup(ip) if ip else None
                except ValueError:
                    raw = None
                out.append(_json.dumps(_shape(raw, self.schema),
                                       sort_keys=True,
                                       separators=(",", ":")))
            return t.append_column(out_col,
                                   pa.array(out, pa.string()))

    return ds.map_batches(_Stage, batch_format="pyarrow",
                          concurrency=concurrency)
