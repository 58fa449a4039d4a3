"""geoip_* method parity (internal/impl/maxmind/bloblang_geoip.go),
running the reference test's exact 8 mapping assertions against
MaxMind's official test databases (reference testdata)."""

import os

import pytest

from bento_ray.blobl import compile_mapping

TD = "/root/reference/internal/impl/maxmind/testdata"

# bloblang_geoip_test.go testCases, verbatim (paths rebased)
CASES = [
    (f'root = "81.2.69.192".geoip_city("{TD}/GeoIP2-City-Test.mmdb")'
     '.City.Names.en', "London"),
    (f'root = "2001:220::80".geoip_country('
     f'"{TD}/GeoIP2-Country-Test.mmdb").Country.Names.en',
     "South Korea"),
    (f'root = "214.0.0.0".geoip_asn("{TD}/GeoLite2-ASN-Test.mmdb")'
     '.AutonomousSystemOrganization',
     "DoD Network Information Center"),
    (f'root = "149.101.100.0".geoip_enterprise('
     f'"{TD}/GeoIP2-Enterprise-Test.mmdb").Traits.ISP',
     "Verizon Wireless"),
    (f'root = "81.2.69.0".geoip_anonymous_ip('
     f'"{TD}/GeoIP2-Anonymous-IP-Test.mmdb").IsTorExitNode', True),
    (f'root = "207.179.48.0".geoip_connection_type('
     f'"{TD}/GeoIP2-Connection-Type-Test.mmdb").ConnectionType',
     "Cellular"),
    (f'root = "89.95.192.0".geoip_domain('
     f'"{TD}/GeoIP2-Domain-Test.mmdb").Domain', "bbox.fr"),
    (f'root = "12.87.120.0".geoip_isp("{TD}/GeoIP2-ISP-Test.mmdb")'
     '.ISP', "AT&T Services"),
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TD), reason="reference testdata unavailable")


@pytest.mark.parametrize("src,expected", CASES,
                         ids=[c[0].split(".geoip_")[1].split("(")[0]
                              for c in CASES])
def test_reference_geoip_cases(src, expected):
    assert compile_mapping(src).run_value(None, env={}) == expected


def test_zero_struct_on_miss_and_invalid_ip():
    out = compile_mapping(
        f'root = "127.0.0.1".geoip_city("{TD}/GeoIP2-City-Test.mmdb")'
    ).run_value(None, env={})
    # geoip2-golang returns the zero struct (no error) on a miss
    assert out["City"] == {"GeoNameID": 0, "Names": None}
    assert out["Postal"] == {"Code": ""}
    assert out["Subdivisions"] is None
    from bento_ray.blobl.values import BloblangError

    with pytest.raises(BloblangError):
        compile_mapping(
            f'root = "not-an-ip".geoip_city('
            f'"{TD}/GeoIP2-City-Test.mmdb")').run_value(None, env={})


def test_city_full_shape():
    out = compile_mapping(
        f'root = "81.2.69.192".geoip_city("{TD}/GeoIP2-City-Test.mmdb")'
    ).run_value(None, env={})
    assert out["Location"]["TimeZone"] == "Europe/London"
    assert out["Country"]["IsoCode"] == "GB"
    assert isinstance(out["Location"]["Latitude"], float)
    assert out["Subdivisions"][0]["IsoCode"] == "ENG"


def test_geoip_stage_distributed():
    import json

    import ray.data as rd

    from bento_ray.geoip import geoip_stage

    ds = rd.from_items([
        {"ip": "81.2.69.192"},   # London in the test DB
        {"ip": "127.0.0.1"},     # miss → zero struct
        {"ip": "not-an-ip"},     # invalid → zero struct
    ])
    out = geoip_stage(ds, "ip", f"{TD}/GeoIP2-City-Test.mmdb",
                      "geoip_city").to_pandas()
    recs = [json.loads(s) for s in out["geo"]]
    assert recs[0]["City"]["Names"]["en"] == "London"
    assert recs[1]["City"] == {"GeoNameID": 0, "Names": None}
    assert recs[2]["Country"]["IsoCode"] == ""
