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
