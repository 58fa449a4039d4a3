"""Faithful transcriptions of the reference's config-driven test corpus
(/root/reference/config/test/*.yaml — the cases the north rule asks to
re-express as golden-output fixtures). Each case keeps the reference's
exact inputs, semantics and expected outputs, run through the engine's
operators + the testing-harness predicates."""

import json

import pyarrow as pa
import pyarrow.compute as pc

from bento_ray.testing import GoldenCase, content_equals, json_contains, metadata_equals


def _b(*contents):
    return pa.table({"content": pa.array(list(contents), pa.string())})


def _filter_batches(pred):
    """Bloblang `root = if <check> { deleted() }` over semantic batches:
    matching rows dropped, empty batches produce no output batch."""

    def proc(batches):
        out = []
        for t in batches:
            kept = t.filter(pc.invert(pred(t)))
            if len(kept):
                out.append(kept)
        return out

    return proc


# -- config/test/filters.yaml ----------------------------------------------

_DELETE_ME = _filter_batches(
    lambda t: pc.match_substring(t.column("content"), "delete me"))


def test_filters_delete_one_of_one():
    """'delete one of one message' → no output batches."""
    out = GoldenCase("filters/one-of-one",
                     [_b("hello world delete me please")],
                     _DELETE_ME, expected_batches=[]).run()
    assert out == []


def test_filters_delete_all():
    out = GoldenCase("filters/delete-all",
                     [_b("hello world delete me please",
                         "hello world 2 delete me please",
                         "hello world 3 delete me please",
                         "hello world 4 delete me please")],
                     _DELETE_ME, expected_batches=[]).run()
    assert out == []


def test_filters_delete_some():
    out = GoldenCase("filters/delete-some",
                     [_b("hello world delete me please",
                         "hello world 2",
                         "hello world 3 delete me please",
                         "hello world 4")],
                     _DELETE_ME).run()
    assert len(out) == 1
    content_equals(out[0], 0, "hello world 2")
    content_equals(out[0], 1, "hello world 4")


# -- config/test/cookbooks/filtering.yaml ----------------------------------

def test_cookbook_filtering():
    """match { meta(topic)==foo || doc.type==bar || doc.urls.contains(...)
    => deleted() } — only the first document survives."""
    t = pa.table({
        "content": pa.array([
            '{"doc":{"should":"remain"},"id":"1"}',
            '{"doc":{"should":"not remain"},"id":"2"}',
            '{"doc":{"should":"not remain","type":"bar"},"id":"3"}',
            '{"doc":{"should":"not remain","urls":'
            '["https://warpstreamlabs.github.io/bento/"]},"id":"4"}',
        ], pa.string()),
        "topic": pa.array([None, "foo", None, None], pa.string()),
    })

    def pred(t):
        drop = []
        for content, topic in zip(t.column("content").to_pylist(),
                                  t.column("topic").to_pylist()):
            d = json.loads(content)
            doc = d.get("doc", {})
            drop.append(
                topic == "foo"
                or doc.get("type") == "bar"
                or "https://warpstreamlabs.github.io/bento/" in doc.get("urls", []))
        return pa.array(drop, pa.bool_())

    out = GoldenCase("cookbooks/filtering", [t],
                     _filter_batches(pred)).run()
    assert len(out) == 1 and len(out[0]) == 1
    content_equals(out[0], 0, '{"doc":{"should":"remain"},"id":"1"}')


# -- config/test/structured_metadata.yaml ----------------------------------

def test_structured_metadata():
    """meta foo/bar/baz assigned nested structures → metadata_equals on
    each (metadata ≙ typed side columns)."""

    def proc(batches):
        out = []
        for t in batches:
            t = t.append_column("foo", pa.array(
                [{"a": "hello"}] * len(t)))
            t = t.append_column("bar", pa.array(
                [{"b": {"c": "hello"}}] * len(t)))
            t = t.append_column("baz", pa.array(
                [[{"a": "hello"}, {"b": {"c": "hello"}}]] * len(t)))
            out.append(t)
        return out

    out = GoldenCase("structured_metadata", [_b("hello")], proc).run()
    metadata_equals(out[0], 0, "foo", {"a": "hello"})
    metadata_equals(out[0], 0, "bar", {"b": {"c": "hello"}})
    metadata_equals(out[0], 0, "baz",
                    [{"a": "hello"}, {"b": {"c": "hello"}}])


# -- config/test/json_contains_predicate.yaml ------------------------------

def test_json_contains_predicate():
    """woof_drop resource processor: drop docs whose
    resource."service.name" == "woof"; assert via json_contains."""
    docs = [
        '{"resource":{"cloud.platform":"aws_eks","host.id":"aaa","service.name":"meow"}}',
        '{"resource":{"cloud.platform":"aws_eks","host.id":"bbb","service.name":"woof"}}',
        '{"resource":{"cloud.platform":"aws_eks","host.id":"ccc","service.name":"quack"}}',
    ]

    def pred(t):
        return pa.array(
            [json.loads(c)["resource"].get("service.name") == "woof"
             for c in t.column("content").to_pylist()], pa.bool_())

    out = GoldenCase("json_contains_predicate", [_b(*docs)],
                     _filter_batches(pred)).run()
    assert len(out) == 1 and len(out[0]) == 2
    json_contains(out[0], 0,
                  {"resource": {"cloud.platform": "aws_eks", "host.id": "aaa"}})
    json_contains(out[0], 1,
                  {"resource": {"cloud.platform": "aws_eks", "host.id": "ccc"}})
