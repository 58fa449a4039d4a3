"""Golden-test harness predicates + metrics taps."""

import json
import time

import pyarrow as pa
import pytest

import ray.data as rd

from bento_ray.testing import (
    GoldenCase,
    bytes_equal,
    content_equals,
    content_matches,
    json_contains,
    json_equals,
    rows_equal,
)


def test_predicates():
    t = pa.table({"content": ['{"a": 1, "b": {"c": 2}}', "hello world"]})
    json_equals(t, 0, {"a": 1, "b": {"c": 2}})
    json_contains(t, 0, {"b": {"c": 2}})
    content_equals(t, 1, "hello world")
    content_matches(t, 1, r"^hello \w+$")
    with pytest.raises(AssertionError):
        json_contains(t, 0, {"missing": 1})
    with pytest.raises(AssertionError):
        content_equals(t, 1, "nope")


def test_rows_equal_order_insensitive():
    a = pa.table({"k": [2, 1], "v": ["b", "a"]})
    b = pa.table({"k": [1, 2], "v": ["a", "b"]})
    rows_equal(a, b)
    with pytest.raises(AssertionError):
        rows_equal(a, pa.table({"k": [1, 2], "v": ["a", "X"]}))


def test_bytes_equal_keyed():
    a = pa.table({"url": ["u1", "u2"], "text": ["x", "y"]})
    b = pa.table({"url": ["u2", "u1"], "text": ["y", "x"]})
    bytes_equal(a, b, "text", key="url")
    with pytest.raises(AssertionError):
        bytes_equal(a, pa.table({"url": ["u1", "u2"], "text": ["x", "z"]}),
                    "text", key="url")


def test_golden_case_runner():
    """FIXTURES.md §4.1 shape: filter pages with a marker → only
    non-matching docs survive; an all-deleted batch produces no batch."""
    import pyarrow.compute as pc

    from bento_ray.stages.dedupe import dedupe_pane

    def processor(batches):
        out = []
        for t in batches:
            kept = t.filter(pc.invert(pc.match_substring(
                t.column("content"), "delete me")))
            if len(kept):
                out.append(kept)
        return out

    case = GoldenCase(
        name="filters.yaml transcription",
        input_batches=[
            pa.table({"content": ["keep", "delete me now", "also keep"]}),
            pa.table({"content": ["delete me", "delete me too... delete me"]}),
        ],
        processor=processor,
        expected_batches=[pa.table({"content": ["keep", "also keep"]})],
    )
    case.run()


def test_metrics_tap_and_shared_counter():
    from bento_ray.metrics import MetricsRegistry, metric_stage

    reg = MetricsRegistry()
    ds = rd.range(1000, override_num_blocks=4)
    ds = metric_stage(ds, reg, "ingest")
    assert ds.count() == 1000
    # fire-and-forget adds need a beat to drain
    for _ in range(50):
        snap = reg.snapshot()
        if snap.get("ingest.rows") == 1000:
            break
        time.sleep(0.05)
    assert snap["ingest.rows"] == 1000
    assert snap["ingest.batches"] >= 1

    # bloblang count(name): 1,2,3... shared across callers
    assert [reg.counter_next("c") for _ in range(3)] == [1, 2, 3]
