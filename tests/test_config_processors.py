"""Message-level composition processors (config surface): switch,
branch, try/catch, retry, for_each, while, cache, group_by_value,
bounds_check, grok, compress, parse_log."""

from __future__ import annotations

import json

import pytest

from bento_ray.blobl.interp import Message
from bento_ray.config.processors import (
    Runtime, build_cache, build_processor, run_processors,
)


def msgs(*contents):
    return [Message.from_content(c) for c in contents]


def out_contents(batches):
    return [m.content_bytes().decode() for b in batches for m in b]


def test_switch_cases_and_fallthrough():
    p = build_processor({"switch": [
        {"check": 'this.kind == "a"',
         "processors": [{"mapping": 'root.tag = "A"\nroot.kind = this.kind'}],
         "fallthrough": True},
        {"check": 'this.kind != "never"',
         "processors": [{"mutation": 'root.seen = true'}]},
    ]})
    batch = msgs({"kind": "a"}, {"kind": "b"})
    out = p.process_batch(batch, Runtime())[0]
    docs = [m.structured() for m in out]
    # message 0 matched case 1 (tagged) AND fell through to case 2
    assert docs[0] == {"tag": "A", "kind": "a", "seen": True}
    # message 1 only matched case 2
    assert docs[1] == {"kind": "b", "seen": True}


def test_switch_unmatched_passthrough():
    p = build_processor({"switch": [
        {"check": "this.x > 5",
         "processors": [{"mapping": 'root.big = true'}]},
    ]})
    out = p.process_batch(msgs({"x": 1}), Runtime())[0]
    assert out[0].structured() == {"x": 1}


def test_branch_enrich_and_skip():
    p = build_processor({"branch": {
        "request_map": 'root = if this.skip { deleted() } else { this }',
        "processors": [{"mapping": 'root.extra = this.v * 10'}],
        "result_map": 'root.enriched = this.extra',
    }})
    batch = msgs({"v": 3, "skip": False}, {"v": 9, "skip": True})
    out = p.process_batch(batch, Runtime())[0]
    assert out[0].structured() == {"v": 3, "skip": False, "enriched": 30}
    # skipped message unchanged
    assert out[1].structured() == {"v": 9, "skip": True}


def test_try_skips_after_error_catch_recovers():
    chain = [
        build_processor({"try": [
            {"mapping": 'root = if this.boom { throw("bad") } else '
                        '{ this }'},
            {"mutation": 'root.second = true'},
        ]}),
        build_processor({"catch": [
            {"mapping": 'root = {"recovered": error()}'},
        ]}),
    ]
    batch = msgs({"boom": False}, {"boom": True})
    out = run_processors(chain, [batch], Runtime())
    docs = sorted((m.structured() for b in out for m in b),
                  key=lambda d: sorted(d))
    ok = [d for d in docs if "second" in d][0]
    rec = [d for d in docs if "recovered" in d][0]
    assert ok == {"boom": False, "second": True}
    assert "bad" in rec["recovered"]
    # catch cleared the error flag
    assert all(m.error is None for b in out for m in b)


def test_retry_until_success():
    rt = Runtime()
    # count() increments per attempt; fails while < 3
    p = build_processor({"retry": {
        "max_retries": 5,
        "processors": [{"mapping":
                        'root = if count("tries") < 3 '
                        '{ throw("again") } else { "done" }'}],
    }})
    out = p.process_batch(msgs({"x": 1}), rt)[0]
    assert out[0].content_bytes() == b"done"
    assert out[0].error is None


def test_while_loop_counts():
    p = build_processor({"while": {
        "check": "this.n < 3",
        "processors": [{"mapping": 'root.n = this.n + 1'}],
    }})
    out = p.process_batch(msgs({"n": 0}), Runtime())[0]
    assert out[0].structured() == {"n": 3}


def test_for_each_isolates_batch_context():
    p = build_processor({"for_each": [
        {"mapping": 'root.size = batch_size()'},
    ]})
    out = p.process_batch(msgs({"a": 1}, {"a": 2}), Runtime())[0]
    assert [m.structured()["size"] for m in out] == [1, 1]


def test_cache_processor_operators():
    rt = Runtime(caches={"c": build_cache({"memory": {}})})
    setp = build_processor({"cache": {
        "resource": "c", "operator": "set",
        "key": '${! json("k") }', "value": '${! json("v") }'}})
    getp = build_processor({"cache": {
        "resource": "c", "operator": "get", "key": '${! json("k") }'}})
    setp.process_batch(msgs({"k": "a", "v": "V1"}), rt)
    out = getp.process_batch(msgs({"k": "a"}), rt)[0]
    assert out[0].content_bytes() == b"V1"
    miss = getp.process_batch(msgs({"k": "zz"}), rt)[0]
    assert miss[0].error == "key does not exist"
    addp = build_processor({"cache": {
        "resource": "c", "operator": "add",
        "key": '${! json("k") }', "value": "x"}})
    first = addp.process_batch(msgs({"k": "new"}), rt)[0]
    assert first[0].error is None
    dup = addp.process_batch(msgs({"k": "new"}), rt)[0]
    assert dup[0].error == "key already exists"


def test_group_by_value_splits_batches():
    p = build_processor({"group_by_value": {
        "value": '${! json("lang") }'}})
    batches = p.process_batch(
        msgs({"lang": "en"}, {"lang": "fr"}, {"lang": "en"}), Runtime())
    sizes = sorted(len(b) for b in batches)
    assert sizes == [1, 2]


def test_bounds_check_drops_offending_batch():
    p = build_processor({"bounds_check": {"max_part_size": 5}})
    assert p.process_batch(msgs("abcdefgh"), Runtime()) == []
    assert len(p.process_batch(msgs("abc"), Runtime())[0]) == 1


def test_grok_processor():
    p = build_processor({"grok": {
        "expressions": ["%{WORD:verb} %{INT:code}"]}})
    out = p.process_batch(msgs("GET 200"), Runtime())[0]
    assert out[0].structured() == {"verb": "GET", "code": "200"}
    bad = p.process_batch(msgs("!!!"), Runtime())[0]
    assert bad[0].error


def test_compress_roundtrip_processors():
    rt = Runtime()
    c = build_processor({"compress": {"algorithm": "gzip"}})
    d = build_processor({"decompress": {"algorithm": "gzip"}})
    out = run_processors([c, d], [msgs("payload")], rt)
    assert out_contents(out) == ["payload"]


def test_parse_log_processor_structured_output():
    p = build_processor({"parse_log": {"format": "syslog_rfc5424"}})
    line = ("<42>4 2049-10-11T22:14:15.003Z host app - 2 "
            "[x k=\"1\"] msg here.")
    out = p.process_batch(msgs(line), Runtime())[0]
    doc = out[0].structured()
    assert doc["appname"] == "app" and doc["message"] == "msg here."


def test_insert_part_positions_message_level():
    p = build_processor({"insert_part": {"content": "NEW", "index": 0}})
    out = p.process_batch(msgs("a", "b"), Runtime())[0]
    assert [m.content_bytes() for m in out] == [b"NEW", b"a", b"b"]


def test_msgpack_roundtrip():
    rt = Runtime()
    to_mp = build_processor({"msgpack": {"operator": "from_json"}})
    to_js = build_processor({"msgpack": {"operator": "to_json"}})
    out = run_processors([to_mp, to_js],
                         [msgs({"a": 1, "b": ["x", 2.5]})], rt)
    assert out[0][0].structured() == {"a": 1, "b": ["x", 2.5]}


def test_msgpack_bloblang_methods():
    from bento_ray.blobl import compile_mapping

    out = compile_mapping(
        'root = this.format_msgpack().parse_msgpack()').run_value(
        {"k": [1, 2]})
    assert out == {"k": [1, 2]}


def test_protobuf_processor_roundtrip():
    rt = Runtime()
    from bento_ray.config.processors import set_config_base_dir

    set_config_base_dir("/root/reference/config/test/protobuf")
    fj = build_processor({"protobuf": {
        "operator": "from_json", "message": "testing.Person",
        "import_paths": ["config/test/protobuf/schema"]}})
    tj = build_processor({"protobuf": {
        "operator": "to_json", "message": "testing.Person",
        "import_paths": ["config/test/protobuf/schema"]}})
    out = run_processors([fj, tj], [msgs({"firstName": "ann", "age": 4})],
                         rt)
    assert out[0][0].structured() == {"firstName": "ann", "age": 4}


def test_awk_processor_via_config():
    p = build_processor({"awk": {
        "codec": "text",
        "program": '{ json_set("greet", "hi " json_get("name")); }'}})
    out = p.process_batch(msgs({"name": "bob"}), Runtime())[0]
    assert out[0].structured() == {"greet": "hi bob", "name": "bob"}


# ------------------------------------------------- review regression tests

def test_switch_case_changing_message_count():
    """A case whose processors change the message count keeps every
    output (the old positional zip silently truncated)."""
    p = build_processor({"switch": [
        {"check": "",
         "processors": [{"unarchive": {"format": "json_array"}}]},
    ]})
    out = p.process_batch(msgs([1, 2, 3]), Runtime())[0]
    assert [m.structured() for m in out] == [1, 2, 3]


def test_try_catch_preserve_batch_order():
    chain = [
        build_processor({"try": [
            {"mapping": 'root = if this.b { throw("x") } else { this }'},
            {"mutation": 'root.ok = true'},
        ]}),
    ]
    batch = msgs({"b": True}, {"b": False}, {"b": True}, {"b": False})
    out = run_processors(chain, [batch], Runtime())[0]
    flags = [bool(m.error) for m in out]
    assert flags == [True, False, True, False]  # input order kept


def test_archive_path_config_respected():
    p = build_processor({"archive": {
        "format": "tar", "path": '${! json("name") }.txt'}})
    packed = p.process_batch(
        msgs({"name": "alpha"}, {"name": "beta"}), Runtime())[0][0]
    import io
    import tarfile

    with tarfile.open(fileobj=io.BytesIO(packed.content_bytes())) as tf:
        assert [i.name for i in tf.getmembers()] == \
            ["alpha.txt", "beta.txt"]


def test_structured_null_root():
    chain = [build_processor({"mapping": "root = null"}),
             build_processor({"mapping": "root.z = this"})]
    out = run_processors(chain, [msgs({"a": 1})], Runtime())[0]
    assert out[0].structured() == {"z": None}
    assert out[0].error is None


def test_bad_path_assignment_marks_not_crashes():
    p = build_processor({"mapping": 'root = [1,2]\nroot.a = 3'})
    out = p.process_batch(msgs({"x": 1}), Runtime())[0]
    assert out[0].error and "unable to set target path" in out[0].error


def test_unarchive_corrupt_payload_flags_not_raises():
    """A corrupt payload must flag THAT message (error contract) and
    pass it through — it used to raise and kill the whole batch."""
    p = build_processor({"unarchive": {"format": "json_array"}})
    good = Message.from_content([1, 2])
    bad = Message.from_content(b"not json at all {")
    out = p.process_batch([good, bad], Runtime())
    flat = [m for b in out for m in b]
    assert [m.error is None for m in flat] == [True, True, False]
    assert flat[2].error.startswith("unarchive:")
    assert flat[2].content_bytes() == b"not json at all {"

    # corrupt zip: same contract
    pz = build_processor({"unarchive": {"format": "zip"}})
    outz = pz.process_batch([Message.from_content(b"PK\x03\x04garbage")],
                            Runtime())
    mz = outz[0][0]
    assert mz.error and mz.error.startswith("unarchive:")


def test_archive_bad_payload_flags_batch():
    """archive json_array over a non-JSON part flags the whole batch
    unchanged instead of crashing the stage."""
    p = build_processor({"archive": {"format": "json_array"}})
    batch = [Message.from_content(b"\xff\xfenot-json")]
    out = p.process_batch(batch, Runtime())
    assert out[0][0].error.startswith("archive:")
    assert out[0][0].content_bytes() == b"\xff\xfenot-json"


def test_metric_gauge_value_and_labels():
    """metric type=gauge stores the interpolated value (not a message
    count); labels fan the name out into per-series keys."""
    rt = Runtime()
    p = build_processor({"metric": {
        "name": "depth", "type": "gauge",
        "value": "${! this.d }"}})
    p.process_batch(msgs({"d": 7}, {"d": 42}), rt)
    assert rt.counters["depth"] == 42.0  # last write wins

    rt2 = Runtime()
    p2 = build_processor({"metric": {
        "name": "seen", "type": "counter",
        "labels": {"lang": "${! this.lang }"}}})
    p2.process_batch(msgs({"lang": "en"}, {"lang": "de"},
                          {"lang": "en"}), rt2)
    assert rt2.counters["seen{lang=en}"] == 2
    assert rt2.counters["seen{lang=de}"] == 1


def test_jq_raw_config_field_forwarded():
    """`jq: {raw: true}` must emit raw text, not JSON-quoted."""
    p = build_processor({"jq": {"query": ".s", "raw": True}})
    out = p.process_batch(msgs({"s": "plain"}), Runtime())
    assert out[0][0].content_bytes() == b"plain"


def test_local_cache_ttl_compaction():
    """Expired entries must be swept even when their keys are never
    get() again (the dedupe workload) — the cache was unbounded."""
    import time as _t

    from bento_ray.state.store import LocalCache

    c = LocalCache(ttl_sec=0.01)
    for i in range(1500):
        c.add(f"k{i}", b"t")
    _t.sleep(0.05)
    # adds of NEW keys trigger the amortized sweep of the old ones
    for i in range(1500, 2600):
        c.add(f"k{i}", b"t")
    assert len(c) < 1500  # old cohort swept, not accumulated


def test_file_cache_key_injective_and_safe(tmp_path):
    """'a/b' and 'a_b' must be distinct keys (the old '/'→'_' mapping
    collided them → silent dedupe false-positive); '..' must stay
    inside the cache dir."""
    from bento_ray.state.store import FileCache

    c = FileCache(str(tmp_path / "fc"))
    assert c.add("a/b", b"1") is True
    assert c.add("a_b", b"2") is True  # collided (False) before the fix
    assert c.get("a/b") == b"1" and c.get("a_b") == b"2"
    assert c.add("..", b"3") is True
    assert c.get("..") == b"3"
    assert sorted(p.name for p in (tmp_path / "fc").iterdir()) == \
        ["%2E%2E", "a%2Fb", "a_b"]
