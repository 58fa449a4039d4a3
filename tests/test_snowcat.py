"""opensnowcat processor parity
(internal/impl/opensnowcat/processor_opensnowcat{,_test}.go), run
against the reference's own page_view.tsv fixture."""

import os

import pytest

from bento_ray.snowcat import OpenSnowcat, parse_enriched_event

FIXTURE = ("/root/reference/internal/impl/opensnowcat/testdata/"
           "page_view.tsv")


@pytest.fixture(scope="module")
def tsv():
    if not os.path.exists(FIXTURE):
        pytest.skip("reference fixture unavailable")
    with open(FIXTURE) as fh:
        return fh.read().rstrip("\n")


def test_json_conversion_matches_reference_assertions(tsv):
    # mirrors TestProcessPageViewJSON (processor_opensnowcat_test.go)
    out = OpenSnowcat(output_format="json").process(tsv)
    assert out["app_id"] == "snwcat"
    assert out["event"] == "page_view"
    assert out["event_id"] == "9fd5fd06-24ad-471b-9f73-f1a054cb0b31"
    assert out["user_id"] == "joaocorreia"
    ua = out["contexts_com_snowplowanalytics_snowplow_ua_parser_context_1"]
    assert len(ua) == 1
    assert ua[0]["useragentFamily"] == "Chrome"
    assert ua[0]["osFamily"] == "Mac OS X"
    wp = out["contexts_com_snowplowanalytics_snowplow_web_page_1"]
    assert len(wp) == 1
    assert wp[0]["id"] == "9689656e-ebab-4c10-9413-59a6dcefadd2"
    fp = out["contexts_com_fingerprintjs_fingerprint_1"]
    assert len(fp) == 1 and fp[0]["visitorId"] == "nmnY3NEe0lGJc4tzh5KM"
    loc = out["contexts_com_dbip_location_1"]
    assert loc[0]["city"]["names"]["en"] == "Del Mar"
    cb = out["contexts_com_clearbit_company_1"]
    assert len(cb) == 1 and cb[0]["name"] == "SnowcatCloud"
    cookies = out["contexts_org_ietf_http_cookie_1"]
    assert len(cookies) >= 2
    names = [c["name"] for c in cookies]
    assert "_gaexp" in names and "ajs_user_id" in names
    # typed columns: Go RFC3339Nano timestamps, native numerics
    assert out["collector_tstamp"] == "2022-03-21T22:12:43.358Z"
    assert out["domain_sessionidx"] == 36


def test_filter_by_ip_drops(tsv):
    eng = OpenSnowcat(output_format="tsv", drop={
        "user_ipaddress": {"contains": ["75.80.110."]}})
    assert eng.process(tsv) is None


def test_filter_by_schema_property(tsv):
    # TestProcessPageViewTSV_FilterBySchemaProperty: Chrome → dropped
    eng = OpenSnowcat(output_format="tsv", drop={
        "com.snowplowanalytics.snowplow.ua_parser_context."
        "useragentFamily": {"contains": ["Chrome", "Firefox"]}})
    assert eng.process(tsv) is None
    # _NoMatch: Firefox-only filter keeps the event
    eng2 = OpenSnowcat(output_format="tsv", drop={
        "com.snowplowanalytics.snowplow.ua_parser_context."
        "useragentFamily": {"contains": ["Firefox"]}})
    assert eng2.process(tsv) is not None


def test_transforms_hash_redact_anonymize(tsv):
    import hashlib

    eng = OpenSnowcat(output_format="json", transform={
        "salt": "s3cret",
        "hash_algo": "SHA-256",
        "fields": {
            "user_id": {"strategy": "hash"},
            "user_ipaddress": {"strategy": "anonymize_ip",
                               "anon_octets": 2},
            "network_userid": {"strategy": "redact",
                               "redact_value": "[REDACTED]"},
            "user_fingerprint": {"strategy": "hash",
                                 "hash_algo": "MD5",
                                 "salt": "other"},
        }})
    out = eng.process(tsv)
    assert out["user_id"] == hashlib.sha256(
        b"joaocorreias3cret").hexdigest()
    assert out["user_ipaddress"] == "75.80.x.x"
    assert out["network_userid"] == "[REDACTED]"


def test_anonymize_ipv6_segments():
    eng = OpenSnowcat()
    cfg = {"anon_octets": 2, "anon_segments": 3}
    assert eng._anon_ip("2001:db8:85a3::8a2e:370:7334", cfg) == \
        "2001:db8:85a3::x:x:x"
    assert eng._anon_ip("10.1.2.3", cfg) == "10.1.x.x"


def test_tsv_mode_preserves_column_count(tsv):
    out = OpenSnowcat(output_format="tsv").process(tsv)
    assert out.count("\t") == tsv.count("\t") == 130


def test_empty_and_boolean_columns(tsv):
    out = parse_enriched_event(tsv)
    # empty TSV columns are omitted entirely
    assert "txn_id" not in out
    for k, v in out.items():
        if k.startswith("br_features_") or k in ("br_cookies",
                                                 "dvce_ismobile"):
            assert isinstance(v, bool)


def test_processor_registration(tsv):
    from bento_ray.config.processors import (Message, Runtime,
                                             build_processor)

    proc = build_processor({"opensnowcat": {"output_format": "json"}})
    msgs = proc.process_batch([Message(tsv.encode())], Runtime())
    assert len(msgs[0]) == 1
    doc = msgs[0][0].structured()
    assert doc["app_id"] == "snwcat"
    # drop path through the processor
    proc2 = build_processor({"opensnowcat": {
        "output_format": "tsv",
        "filters": {"drop": {"user_ipaddress":
                             {"contains": ["75.80."]}}}}})
    rt = Runtime()
    msgs2 = proc2.process_batch([Message(tsv.encode())], rt)
    assert msgs2 == [[]]
    assert rt.counters["opensnowcat.dropped"] == 1


def test_snowcat_stage_distributed(tsv):
    import json

    import ray.data as rd

    from bento_ray.snowcat import snowcat_stage

    ds = rd.from_items([{"content": tsv}, {"content": tsv}])
    out = snowcat_stage(ds, output_format="json").to_pandas()
    assert len(out) == 2
    doc = json.loads(out["content"][0])
    assert doc["app_id"] == "snwcat"
    # drop filter inside the stage
    dropped = snowcat_stage(
        rd.from_items([{"content": tsv}]),
        drop={"user_ipaddress": {"contains": ["75.80."]}}).to_pandas()
    assert len(dropped) == 0
