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


def test_parse_log_syslog():
    from bento_ray.stages.parsers import parse_log_stage

    ds = rd.from_items([
        {"content": "2024-02-03T04:05:06Z web01 nginx[7]: GET / 200"}])
    out = parse_log_stage(ds).to_pandas().iloc[0]
    assert out["app"] == "nginx" and out["pid"] == "7"
    assert out["message"] == "GET / 200"


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
    errs = out["err"].tolist()
    assert errs[0] is None
    assert "expected integer" in errs[1]
    assert "missing required" in errs[2]
    assert "invalid json" in errs[3]


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
