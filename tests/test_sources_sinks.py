"""Sources, sinks, try/catch error routing, workflow DAG, joins."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd


def test_generate_sequence_broker_read_until():
    from bento_ray.sources import broker, from_generate, read_until, sequence

    gen = from_generate(
        lambda t: pa.table({"v": pc.multiply(t.column("id"), pa.scalar(2))}),
        count=10, batch_size=5)
    assert sorted(r["v"] for r in gen.take_all()) == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]

    a = rd.from_items([{"x": 1}])
    b = rd.from_items([{"x": 2}])
    assert sorted(r["x"] for r in sequence(a, b).take_all()) == [1, 2]
    assert broker(a, b).count() == 2

    src = rd.range(100)
    out = read_until(src, lambda t: bool(pc.any(
        pc.greater_equal(t.column("id"), pa.scalar(10))).as_py()),
        batch_size=8)
    got = [r["id"] for r in out.take_all()]
    assert 10 in got and len(got) < 100


def test_registry_inproc():
    from bento_ray.sources import register_stream, resource

    ds = rd.range(3)
    register_stream("foo", ds)
    assert resource("foo").count() == 3


def test_sink_switch_and_fanout(tmp_path):
    from bento_ray.sinks import fan_out, switch_output

    ds = rd.from_items([{"k": i, "even": i % 2 == 0} for i in range(10)])
    res = switch_output(
        ds,
        [(lambda t: t.column("even"), lambda d: d.count())],
        default=lambda d: d.count(),
    )
    assert res == [5, 5]
    assert fan_out(ds, [lambda d: d.count(), lambda d: d.count()]) == [10, 10]


def test_sink_fallback_and_retry():
    from bento_ray.sinks import fallback, retry_sink

    ds = rd.range(5)

    def bad(d):
        raise RuntimeError("down")

    assert fallback(ds, [bad, lambda d: d.count()]) == 5
    calls = {"n": 0}

    def flaky(d):
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return d.count()

    assert retry_sink(ds, flaky, attempts=3, backoff_sec=0.01) == 5


def test_try_catch_error_routing():
    from bento_ray.sinks import reject_errored
    from bento_ray.stages.compose import catch_errors, try_stage

    ds = rd.from_items([{"v": 2}, {"v": 0}, {"v": 5}])

    def inv(t: pa.Table) -> pa.Table:
        vals = t.column("v").to_pylist()
        out = [1.0 / v for v in vals]  # raises ZeroDivisionError on 0
        return t.append_column("inv", pa.array(out, pa.float64()))

    tried = try_stage(ds, inv).materialize()
    rows = sorted(tried.take_all(), key=lambda r: r["v"])
    assert rows[0]["v"] == 0 and rows[0]["err"] is not None
    assert rows[1]["v"] == 2 and rows[1]["err"] is None
    assert rows[1]["inv"] == 0.5

    ok, bad = reject_errored(tried, lambda d: d.count(), lambda d: d.count())
    assert (ok, bad) == (2, 1)

    caught = catch_errors(tried).take_all()
    assert all(r["err"] is None for r in caught)


def test_workflow_dag_layers():
    from bento_ray.stages.compose import workflow

    ds = rd.from_items([{"a": 1}, {"a": 2}])
    out = workflow(ds, {
        "b": ((), lambda t: t.append_column(
            "b", pc.multiply(t.column("a"), pa.scalar(10)))),
        "c": (("b",), lambda t: t.append_column(
            "c", pc.add(t.column("b"), pa.scalar(1)))),
    })
    rows = sorted(out.take_all(), key=lambda r: r["a"])
    assert rows[0]["c"] == 11 and rows[1]["c"] == 21

    with pytest.raises(ValueError, match="cycle"):
        workflow(ds, {"x": (("y",), lambda t: t),
                      "y": (("x",), lambda t: t)})


def test_broadcast_and_versioned_join():
    from bento_ray.stages.join import broadcast_join, broadcast_join_versioned

    facts = rd.from_items([
        {"k": "a", "ts": 10}, {"k": "b", "ts": 20}, {"k": "a", "ts": 30}])
    dim = pa.table({"k": ["a", "b"], "name": ["A", "B"]})
    out = broadcast_join(facts, dim, on="k", concurrency=2).to_pandas()
    assert sorted(out["name"]) == ["A", "A", "B"]

    versions = pa.table({
        "k": ["a", "a", "b"],
        "name": ["A1", "A2", "B1"],
        "vts": [0, 25, 0],
    })
    out = broadcast_join_versioned(
        facts, versions, on="k", fact_ts="ts", version_ts="vts",
        concurrency=2).to_pandas().sort_values("ts")
    assert out["name"].tolist() == ["A1", "B1", "A2"]


# --------------------------------------------------------------- scanners

def test_scanner_chunker_reference_vector():
    """scanner_chunker_test.go: size 4 over the alphabet."""
    from bento_ray.sources.scanners import chunker

    got = list(chunker(4)(b"abcdefghijklmnopqrstuvwxyz"))
    assert got == [b"abcd", b"efgh", b"ijkl", b"mnop", b"qrst",
                   b"uvwx", b"yz"]


def test_scanner_re_match_reference_vectors():
    """scanner_re_match_test.go:30-35."""
    from bento_ray.sources.scanners import re_match

    assert list(re_match(r"(?m)^")(b"foo\nbar\nbaz")) == \
        [b"foo\n", b"bar\n", b"baz"]
    assert list(re_match("split")(b"foo\nbar\nsplit\nbaz\nsplitsplit")) == \
        [b"foo\nbar\n", b"split\nbaz\n", b"split", b"split"]
    assert list(re_match(r"\n")(b"split")) == [b"split"]
    assert list(re_match("split")(b"split")) == [b"split"]


def test_scanner_decompress_tar_composition(tmp_path):
    import gzip
    import io
    import tarfile

    from bento_ray.sources.scanners import decompress, tar

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in [("a.txt", b"alpha"), ("b.txt", b"beta")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    tgz = gzip.compress(buf.getvalue())
    got = list(decompress("gzip", tar())(tgz))
    assert got == [b"alpha", b"beta"]


def test_scanner_csv_and_skip_bom():
    import json

    from bento_ray.sources.scanners import csv_scanner, skip_bom

    got = [json.loads(x) for x in
           skip_bom(csv_scanner())(b"\xef\xbb\xbfa,b\n1,2\n3,4")]
    assert got == [{"a": "1", "b": "2"}, {"a": "3", "b": "4"}]


def test_scan_paths_distributed(ray_session, tmp_path):
    from bento_ray.sources.scanners import re_match, scan_paths

    for i in range(3):
        (tmp_path / f"f{i}.log").write_bytes(
            b"line one\nsplit two\nsplit three")
    out = scan_paths(str(tmp_path), re_match("split")).to_pandas()
    assert len(out) == 9
    assert set(out["content"]) == {b"line one\n", b"split two\n",
                                   b"split three"}


def test_drop_on_error_policies(ray_session):
    import ray.data as rd

    from bento_ray.sinks.outputs import drop_on

    ds = rd.range(10)

    def failing(_):
        raise RuntimeError("connect: connection refused")

    # error=True drops any failure
    res = drop_on(ds, failing, error=True)
    assert res["dropped"]
    # pattern match drops
    res = drop_on(ds, failing, error_patterns=["connection refused"])
    assert res["dropped"]
    # non-matching pattern re-raises
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        drop_on(ds, failing, error_patterns=["quota exceeded"])
    # healthy sink passes through
    assert drop_on(ds, lambda d: d.count(), error=True) == 10


# ------------------------------------------------- subprocess input/output

def test_subprocess_input_lines(ray_session):
    from bento_ray.sources.inputs import subprocess_input

    ds = subprocess_input("sh", ["-c", "printf 'a\\nb\\nc\\n'"])
    rows = [r["content"] for r in ds.take_all()]
    assert rows == [b"a", b"b", b"c"]


def test_subprocess_input_restart_on_exit(ray_session):
    from bento_ray.sources.inputs import subprocess_input

    ds = subprocess_input("sh", ["-c", "echo once"],
                          restart_on_exit=True, max_restarts=2)
    rows = [r["content"] for r in ds.take_all()]
    assert rows == [b"once", b"once", b"once"]  # initial run + 2 restarts


def test_subprocess_input_bad_codec():
    import pytest

    from bento_ray.sources.inputs import subprocess_input

    with pytest.raises(ValueError, match="codec"):
        subprocess_input("cat", codec="netstring")


def test_subprocess_output_lines(ray_session, tmp_path):
    import ray.data as rd

    from bento_ray.sinks.outputs import subprocess_output

    out_f = tmp_path / "sink.txt"
    ds = rd.from_items([{"content": b"one"}, {"content": b"two"}])
    n = subprocess_output(ds, "sh", ["-c", f"cat > {out_f}"])
    assert n == 2
    assert out_f.read_bytes() == b"one\ntwo\n"


def test_subprocess_output_structured_rows_as_json(ray_session, tmp_path):
    import ray.data as rd

    from bento_ray.sinks.outputs import subprocess_output

    out_f = tmp_path / "sink.jsonl"
    ds = rd.from_items([{"a": 1}, {"a": 2}])
    n = subprocess_output(ds, "sh", ["-c", f"cat > {out_f}"])
    assert n == 2
    assert out_f.read_bytes() == b'{"a":1}\n{"a":2}\n'


def _warc_record(rtype: str, uri: str | None, payload: bytes) -> bytes:
    h = (f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
         + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
         + "WARC-Date: 2026-08-18T00:00:00Z\r\n"
         + f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return h + payload + b"\r\n\r\n"


def test_warc_scanner_length_delimited():
    from bento_ray.sources.scanners import parse_warc_record, warc

    # the second payload CONTAINS "WARC/1.0" — a regex splitter would
    # cut it; the Content-Length walk must not
    data = (_warc_record("warcinfo", None, b"software: test")
            + _warc_record("response", "http://a.com/x",
                           b"<html>WARC/1.0 inside payload</html>")
            + _warc_record("response", "http://b.com/y", b""))
    recs = list(warc()(data))
    assert len(recs) == 3
    parsed = [parse_warc_record(r) for r in recs]
    assert [p["headers"]["warc-type"] for p in parsed] == \
        ["warcinfo", "response", "response"]
    assert parsed[1]["headers"]["warc-target-uri"] == "http://a.com/x"
    assert b"WARC/1.0 inside payload" in parsed[1]["payload"]
    assert parsed[2]["payload"] == b""


def test_warc_scanner_malformed():
    import pytest as _pytest

    from bento_ray.sources.scanners import warc

    with _pytest.raises(ValueError, match="expected version line"):
        list(warc()(b"not a warc stream\r\n\r\n"))
    with _pytest.raises(ValueError, match="Content-Length"):
        list(warc()(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"))


def test_read_warc_distributed(tmp_path):
    import gzip

    from bento_ray.sources.scanners import (build_scanner, decompress,
                                            read_warc, scan_paths)

    raw = (_warc_record("response", "http://a.com/1", b"alpha")
           + _warc_record("response", "http://a.com/2", b"beta"))
    p1 = tmp_path / "part1.warc"
    p1.write_bytes(raw)
    p2 = tmp_path / "part2.warc"
    p2.write_bytes(_warc_record("response", "http://b.com/3", b"gamma"))
    df = read_warc([str(p1), str(p2)]).to_pandas() \
        .sort_values("target_uri").reset_index(drop=True)
    assert list(df["target_uri"]) == \
        ["http://a.com/1", "http://a.com/2", "http://b.com/3"]
    assert list(df["payload"]) == [b"alpha", b"beta", b"gamma"]
    assert (df["warc_type"] == "response").all()

    # .warc.gz member via the composed decompress scanner + YAML name
    pg = tmp_path / "part.warc.gz"
    pg.write_bytes(gzip.compress(raw))
    sc = build_scanner({"decompress": {"algorithm": "gzip",
                                       "into": {"warc": {}}}})
    got = scan_paths([str(pg)], sc, include_path=False).to_pandas()
    assert len(got) == 2
    assert decompress is not None


def test_warc_corpus_roundtrip_curation():
    """q_warc_curation reaches documents ONLY through the synthesized
    .warc.gz corpus; its per-lang summary must equal the same curation
    computed from the parquet directly (the WARC writer/scanner/reader
    chain is the thing under test)."""
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from bento_ray.pipelines.queries import q_warc_curation

    sf = "/root/testdata/sf0.001"
    got = (q_warc_curation(sf).to_pandas()
           .sort_values("lang").reset_index(drop=True))

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["lang", "text"]).to_pandas()
    t["nw"] = [len(re.findall(r"\S+", s)) for s in t["text"]]
    want = (t.groupby("lang")
            .agg(n_docs=("nw", "size"),
                 n_kept=("nw", lambda s: int((s >= 10).sum())),
                 total_words=("nw", "sum"))
            .reset_index().sort_values("lang").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64", "n_kept": "int64",
                    "total_words": "int64"}),
        want.astype({"n_docs": "int64", "n_kept": "int64",
                     "total_words": "int64"}))


def test_read_warc_gzip_compression_param(tmp_path):
    import gzip

    from bento_ray.sources.scanners import read_warc

    raw = (_warc_record("response", "http://a.com/1", b"alpha beta")
           + _warc_record("warcinfo", None, b"software: x"))
    p = tmp_path / "m.warc.gz"
    p.write_bytes(gzip.compress(raw))
    df = read_warc([str(p)], compression="gzip").to_pandas()
    assert len(df) == 2
    assert set(df["warc_type"]) == {"response", "warcinfo"}
    assert df.loc[df["warc_type"] == "response", "payload"].iloc[0] \
        == b"alpha beta"


def test_switch_output_first_match_routing(ray_session):
    """A row matching several predicates goes ONLY to the first
    matching sink (output_switch.go first-match semantics) — it was
    delivered to every matching sink."""
    from bento_ray.sinks import switch_output

    ds = rd.from_items([{"x": i} for i in range(10)])
    got: dict[str, list] = {"a": [], "b": []}

    def _sink(name):
        def _s(sub):
            got[name].extend(sub.to_pandas()["x"].tolist())
            return name
        return _s

    switch_output(ds, [
        (lambda t: pc.less(t.column("x"), 7), _sink("a")),   # x < 7
        (lambda t: pc.less(t.column("x"), 9), _sink("b")),   # x < 9
    ])
    assert sorted(got["a"]) == list(range(7))
    assert sorted(got["b"]) == [7, 8]  # 0-6 already claimed by route a


def test_warc_scanner_bare_lf_padding():
    """LF-separated WARC records must scan (the 2-byte padding slice
    read b'\\nW' mid-stream and raised 'malformed')."""
    from bento_ray.sources.scanners import warc

    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: resource\r\n"
           b"Content-Length: 4\r\n"
           b"\r\n"
           b"ABCD\r\n\r\n")
    lf_padded = rec + b"\n" + rec  # bare-LF inter-record padding
    out = list(warc()(lf_padded))
    assert len(out) == 2
    assert all(o.startswith(b"WARC/1.0") for o in out)


# -------------------------------------------- review-finding regressions

def test_round_robin_delivers_every_row(tmp_path):
    """split(equal=True) silently drops the remainder — the broker
    must deliver all rows across its shards."""
    import ray as _ray

    from bento_ray.sinks.outputs import round_robin

    ds = _ray.data.from_items([{"x": i} for i in range(10)]) \
        .repartition(5)
    seen = []
    sinks = [lambda d, _b=b: seen.extend(
        r["x"] for r in d.take_all()) for b in range(3)]
    round_robin(ds, sinks)
    assert sorted(seen) == list(range(10))


def test_switch_output_empty_routes_and_null_predicates():
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray

    from bento_ray.sinks.outputs import switch_output

    ds = _ray.data.from_items([{"x": 1}, {"x": None}, {"x": 5}])
    got = {}

    def _sink(name):
        def s(d):
            col = d.to_pandas()["x"]
            got[name] = sorted(-1 if v is None or v != v else v
                               for v in col)
        return s

    # empty routes: everything lands on default
    switch_output(ds, [], default=_sink("default_only"))
    assert got["default_only"] == [-1, 1, 5]
    # null predicate results go to default, not into the void
    switch_output(
        ds, [(lambda t: pc.greater(t.column("x"), 2), _sink("big"))],
        default=_sink("rest"))
    assert got["big"] == [5]
    assert got["rest"] == [-1, 1]


def test_lines_scanner_crlf_and_custom_delimiter():
    from bento_ray.sources.scanners import build_scanner, lines

    assert list(lines()(b"a\r\nb\r\n")) == [b"a", b"b"]
    assert list(lines()(b"a\rb\nc")) == [b"a\rb", b"c"]   # interior \r kept
    assert list(lines()(b"\n")) == [b""]                  # bufio: one empty
    assert list(lines()(b"")) == []
    sc = build_scanner({"lines": {"custom_delimiter": "|"}})
    assert list(sc(b"a|b|c")) == [b"a", b"b", b"c"]
    sc2 = build_scanner({"lines": {"omit_empty": True}})
    assert list(sc2(b"a\n\nb\n")) == [b"a", b"b"]


def test_csv_scanner_field_count_mismatch_errors():
    import pytest as _pytest

    from bento_ray.sources.scanners import csv_scanner

    with _pytest.raises(ValueError, match="fields"):
        list(csv_scanner()(b"a,b\n1\n"))
    with _pytest.raises(ValueError, match="fields"):
        list(csv_scanner()(b"a,b\n1,2,3\n"))


def test_warc_truncated_payload_raises():
    import pytest as _pytest

    from bento_ray.sources.scanners import warc

    rec = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
           b"Content-Length: 100\r\n\r\nshort")
    with _pytest.raises(ValueError, match="truncated WARC record"):
        list(warc()(rec))


def test_salted_partition_spreads_hot_key():
    import numpy as np

    from bento_ray.util import salted_partition

    import pyarrow as pa

    keys = pa.array(["hot"] * 64 + ["cold"])
    parts = salted_partition(keys, 16, salt_bits=3)
    # the hot key's rows must land on more than one partition
    assert len(np.unique(parts[:64])) > 1
    # and without salt it stays deterministic single-partition
    parts0 = salted_partition(keys, 16)
    assert len(np.unique(parts0[:64])) == 1
