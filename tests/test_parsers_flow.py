"""Parsers (grok/parse_log/jsonschema/parquet serde) and control flow
(while/for_each/rate_limit/cached)."""

import time

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd


def test_grok_named_groups():
    from bento_ray.stages.parsers import grok_stage

    ds = rd.from_items([
        {"content": "2024-01-01T10:00:00Z host1 app[42]: something happened"},
        {"content": "not a log line ----"},
    ])
    out = grok_stage(
        ds, "%{TIMESTAMP_ISO8601:ts} %{IPORHOST:host} %{NOTSPACE:app}: "
            "%{GREEDYDATA:message}").to_pandas()
    row = out[out["content"].str.startswith("2024")].iloc[0]
    assert row["host"] == "host1"
    assert row["message"] == "something happened"
    bad = out[~out["content"].str.startswith("2024")].iloc[0]
    assert bad["host"] is None


def test_parse_log_syslog_plain():
    from bento_ray.stages.parsers import parse_log_stage

    ds = rd.from_items([
        {"content": "2024-02-03T04:05:06Z web01 nginx[7]: GET / 200"}])
    out = parse_log_stage(ds, fmt="syslog_plain").to_pandas().iloc[0]
    assert out["app"] == "nginx" and out["pid"] == "7"
    assert out["message"] == "GET / 200"


def test_parse_log_rfc5424_reference_vector():
    """processor_parse_log_test.go:28-33 — byte-identical output."""
    import json

    from bento_ray.stages.parsers import parse_log_stage

    line = ('<42>4 2049-10-11T22:14:15.003Z toaster.smarthome myapp - 2 '
            '[home01 device_id="43"] failed to make a toast.')
    ds = rd.from_items([{"content": line}])
    out = parse_log_stage(ds, fmt="syslog_rfc5424").to_pandas().iloc[0]
    assert out["content"] == (
        '{"appname":"myapp","facility":5,"hostname":"toaster.smarthome",'
        '"message":"failed to make a toast.","msgid":"2","priority":42,'
        '"severity":2,"structureddata":{"home01":{"device_id":"43"}},'
        '"timestamp":"2049-10-11T22:14:15.003Z","version":4}')
    assert out["err"] is None


def test_parse_log_rfc3164_and_best_effort():
    import datetime
    import json

    from bento_ray.stages.parsers import parse_log_stage

    ds = rd.from_items([
        {"content": "<28>Dec  2 16:49:23 host app[23410]: Test"},
        {"content": "not a syslog at all."}])
    df = parse_log_stage(ds, fmt="syslog_rfc3164").to_pandas()
    y = datetime.datetime.now().year
    good_row = [json.loads(c) for c in df["content"] if c.startswith("{")][0]
    assert good_row == {"appname": "app", "facility": 3, "hostname": "host",
                        "message": "Test", "priority": 28,
                        "procid": "23410", "severity": 4,
                        "timestamp": f"{y}-12-02T16:49:23Z"}
    # best-effort: unparseable line passes through unchanged + err set
    bad = df[df["content"] == "not a syslog at all."]
    assert len(bad) == 1 and bad.iloc[0]["err"]


def test_json_schema_validation_err_column():
    from bento_ray.stages.parsers import json_schema_stage

    schema = {"type": "object", "required": ["id"],
              "properties": {"id": {"type": "integer"}}}
    ds = rd.from_items([
        {"content": '{"id": 1}'},
        {"content": '{"id": "x"}'},
        {"content": '{"nope": 1}'},
        {"content": 'not json'},
    ])
    out = json_schema_stage(ds, schema).to_pandas()
    # block order is not guaranteed across actors — key by content
    errs = dict(zip(out["content"], out["err"]))
    assert errs['{"id": 1}'] is None
    assert "expected integer" in errs['{"id": "x"}']
    assert "missing required" in errs['{"nope": 1}']
    assert "invalid json" in errs["not json"]


def test_parquet_roundtrip():
    from bento_ray.stages.parsers import parquet_decode, parquet_encode

    t = pa.table({"a": [1, 2, 3]})
    assert parquet_decode(parquet_encode(t)).equals(t)


def test_while_stage():
    from bento_ray.stages.flow import while_stage

    ds = rd.from_items([{"v": 1}])
    out = while_stage(
        ds,
        check=lambda t: t.column("v")[0].as_py() < 10,
        fn=lambda t: t.set_column(0, "v", pc.multiply(t.column("v"),
                                                      pa.scalar(2))),
    ).take_all()
    assert out[0]["v"] == 16  # 1→2→4→8→16


def test_for_each_isolates_rows():
    from bento_ray.stages.flow import for_each

    ds = rd.from_items([{"v": 1}, {"v": 2}])

    def fn(t: pa.Table) -> pa.Table:
        assert len(t) == 1  # row isolation contract
        return t.append_column("n", pa.array([len(t)], pa.int64()))

    out = for_each(ds, fn).take_all()
    assert all(r["n"] == 1 for r in out)


def test_rate_limit_throttles():
    from bento_ray.stages.flow import TokenBucket

    b = TokenBucket(count=2, interval_sec=0.1)
    t0 = time.monotonic()
    for _ in range(5):
        b.acquire()
    assert time.monotonic() - t0 >= 0.1  # had to wait for a refill


def test_cached_enricher_memoises():
    from bento_ray.stages.flow import CachedEnricher

    calls = []

    def lookup(keys):
        calls.append(list(keys))
        return [k.upper() for k in keys]

    enr = CachedEnricher(lookup, "k", "K")
    t1 = pa.table({"k": ["a", "b", "a"]})
    out1 = enr(t1)
    assert out1.column("K").to_pylist() == ["A", "B", "A"]
    assert calls == [["a", "b"]]  # deduped miss batch
    out2 = enr(pa.table({"k": ["b", "c"]}))
    assert out2.column("K").to_pylist() == ["B", "C"]
    assert calls == [["a", "b"], ["c"]]  # only the new key
    # 'b' in the second batch is the only true cache hit (the repeated
    # 'a' in batch 1 was deduplicated within the miss batch, not served
    # from cache)
    assert enr.hits == 1


def test_token_bucket_acquire_over_capacity():
    """acquire(n) with n > bucket capacity must drain in
    capacity-sized chunks across intervals, not spin forever (a
    per_row=True stage with a batch bigger than `count` deadlocked)."""
    import time as _time

    from bento_ray.stages.flow import TokenBucket

    b = TokenBucket(count=10, interval_sec=0.01)
    t0 = _time.monotonic()
    b.acquire(35)  # 10 now + 3 refills
    took = _time.monotonic() - t0
    assert took < 5.0  # terminates (would hang before the fix)
    assert b._tokens == 5  # 40 granted across 4 windows, 35 consumed


def test_jsonschema_bool_is_not_integer_and_null_type():
    """JSON-schema semantics: booleans are NOT integers/numbers
    (Python's isinstance(True, int) is), and type 'null' must
    validate instead of KeyError-ing into 'invalid json'."""
    from bento_ray.stages.parsers import JsonSchemaValidator

    v = JsonSchemaValidator({"type": "integer"})
    t = pa.table({"content": ["true", "3", "3.5"]})
    errs = v(t).column("err").to_pylist()
    assert errs[0] == "expected integer, got bool"
    assert errs[1] is None
    assert errs[2] == "expected integer, got float"

    v2 = JsonSchemaValidator({"type": "null"})
    errs2 = v2(pa.table({"content": ["null", "1"]})) \
        .column("err").to_pylist()
    assert errs2[0] is None
    assert errs2[1] == "expected null, got int"

    v3 = JsonSchemaValidator({"type": "number"})
    errs3 = v3(pa.table({"content": ["true", "3.5"]})) \
        .column("err").to_pylist()
    assert errs3[0] == "expected number, got bool"
    assert errs3[1] is None
