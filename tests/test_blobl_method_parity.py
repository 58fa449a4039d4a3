"""Method parity against the reference's query test tables.

Each case mirrors a concrete entry in
internal/bloblang/query/methods_test.go / methods_strings_test.go /
methods_structured_test.go: the same target value, arguments and
expected output, expressed as a query string over `this`.
"""

from __future__ import annotations

import pytest

from bento_ray.blobl import compile_mapping

CASES = [
    # methods_test.go "check map each" family
    ('root = this.map_each(this.uppercase())', ["foo", "bar"],
     ["FOO", "BAR"]),
    ('root = this.map_each(("(" + this + ")").uppercase())',
     ["foo", "bar"], ["(FOO)", "(BAR)"]),
    ('root = this.map_each(this.value.uppercase())',
     {"foo": "hello world", "bar": "this is ash"},
     {"foo": "HELLO WORLD", "bar": "THIS IS ASH"}),
    # methods_strings_test.go replace_all_many
    ('root = this.replace_all_many(["<b>","BOLD","</b>","!BOLD",'
     '"<i>","ITA","</i>","!ITA"])',
     "<i>hello</i> <b>world</b>", "ITAhello!ITA BOLDworld!BOLD"),
    # index_of
    ('root = this.index_of("bar")', "foobar", 3),
    ('root = this.index_of("bar")', "foo", -1),
    # slice
    ('root = this.slice(0, 3)', "foo bar", "foo"),
    ('root = this.slice(-3)', "foo bar", "bar"),
    # split / join
    ('root = this.split(",")', "foo,bar,baz", ["foo", "bar", "baz"]),
    ('root = this.join(",")', ["foo", "bar"], "foobar".replace(
        "foobar", "foo,bar")),
    # trim family
    ('root = this.trim()', "  space  ", "space"),
    ('root = this.trim("!?")', "!!?hello world?!", "hello world"),
    ('root = this.trim_prefix("v")', "v1.2.3", "1.2.3"),
    ('root = this.trim_suffix(".tar.gz")', "dist.tar.gz", "dist"),
    # case
    ('root = this.capitalize()', "hello world", "Hello World"),
    # contains
    ('root = this.contains("foo")', "hello foo world", True),
    ('root = this.contains(30)', [10, 20, 30], True),
    ('root = this.contains("bar")', {"a": "foo", "b": "bar"}, True),
    # has_prefix / has_suffix
    ('root = this.has_prefix("foo")', "foobar", True),
    ('root = this.has_suffix("bar")', "foobar", True),
    # structured
    ('root = this.append("and", "this")', ["foo", "bar"],
     ["foo", "bar", "and", "this"]),
    ('root = this.enumerated()', ["a", "b"],
     [{"index": 0, "value": "a"}, {"index": 1, "value": "b"}]),
    ('root = this.flatten()', [["foo"], [], "bar", ["baz", "buz"]],
     ["foo", "bar", "baz", "buz"]),
    ('root = this.keys().sort()', {"b": 2, "a": 1}, ["a", "b"]),
    ('root = this.values().sort()', {"b": 2, "a": 1}, [1, 2]),
    ('root = this.collapse()', {"foo": [{"bar": "1"}, {"bar": "2"}]},
     {"foo.0.bar": "1", "foo.1.bar": "2"}),
    ('root = this.sum()', [1, 2, 3], 6),
    ('root = this.unique()', [1, 2, 2, 3, 1], [1, 2, 3]),
    ('root = this.without("b")', {"a": 1, "b": 2, "c": 3},
     {"a": 1, "c": 3}),
    ('root = this.with("a", "c")', {"a": 1, "b": 2, "c": 3},
     {"a": 1, "c": 3}),
    ('root = this.squash()', [{"a": 1}, {"b": 2}], {"a": 1, "b": 2}),
    ('root = this.assign({"b": 9})', {"a": 1, "b": 2},
     {"a": 1, "b": 9}),
    ('root = this.exists("a.b")', {"a": {"b": 1}}, True),
    ('root = this.exists("a.z")', {"a": {"b": 1}}, False),
    ('root = this.get("a.b")', {"a": {"b": 2}}, 2),
    # numbers
    ('root = this.abs()', -7, 7),
    ('root = this.ceil()', 1.2, 2),
    ('root = this.floor()', 1.8, 1),
    ('root = this.round()', 2.5, 3),
    ('root = this.max(3)', 2, 3),
    ('root = this.min(3)', 5, 3),
    ('root = this.max()', [3, 9, 5], 9),
    # type conversions
    ('root = this.string()', 10, "10"),
    ('root = this.number()', "42", 42),
    ('root = this.bool()', "true", True),
    ('root = this.type()', [1], "array"),
    # encoding round trips
    ('root = this.encode("hex")', "hello", "68656c6c6f"),
    ('root = "68656c6c6f".decode("hex").string()', {}, "hello"),
    # regex
    ('root = this.re_match("[a-z]+[0-9]+")', "foo123", True),
    ('root = this.re_replace_all("[0-9]+", "x")', "a1b22c333", "axbxcx"),
    # fold with explicit tally
    ('root = this.fold(10, tally + value)', [1, 2], 13),
]


@pytest.mark.parametrize("query,doc,want", CASES,
                         ids=[c[0][:45] for c in CASES])
def test_method_parity(query, doc, want):
    from bento_ray.blobl.interp import Message

    # pass the doc as an already-structured value (string docs would
    # otherwise be parsed as JSON content)
    msg = Message(structured=doc)
    out = compile_mapping(query).run_batch([msg])
    got = out[0].structured() if out[0]._parsed else out[0].raw
    assert got == want, (query, got, want)


def test_parse_xml_reference_examples():
    """internal/impl/xml/bloblang.go:25-36 doc examples."""
    got = compile_mapping('root.doc = this.doc.parse_xml()').run_value(
        {"doc": "<root><title>This is a title</title>"
                "<content>This is some content</content></root>"})
    assert got == {"doc": {"root": {"content": "This is some content",
                                    "title": "This is a title"}}}
    got = compile_mapping(
        'root.doc = this.doc.parse_xml(cast: true)').run_value(
        {"doc": '<root><title>This is a title</title>'
                '<number id=99>123</number><bool>True</bool></root>'})
    assert got == {"doc": {"root": {
        "bool": True, "number": {"#text": 123, "-id": 99},
        "title": "This is a title"}}}


def test_parse_xml_repeated_elements_become_arrays():
    got = compile_mapping('root = this.x.parse_xml()').run_value(
        {"x": "<r><i>1</i><i>2</i></r>"})
    assert got == {"r": {"i": ["1", "2"]}}
