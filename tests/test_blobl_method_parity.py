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


# ------------------------------------------------------- AES methods
# methods_test.go:1702-1900 "check aes-*" cases, run as full mapping
# chains (decode hex → crypt → encode hex) like the reference does.
AES_CASES = [
    # ctr round trip (doc example methods_strings.go:287-292)
    ('root = this.v.encrypt_aes("ctr",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")).encode("hex")',
     {"v": "hello world!"}, "84e9b31ff7400bdf80be7254"),
    ('root = this.v.decode("hex").decrypt_aes("ctr",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")).string()',
     {"v": "84e9b31ff7400bdf80be7254"}, "hello world!"),
    # ofb
    ('root = this.v.encrypt_aes("ofb",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"000102030405060708090a0b0c0d0e0f".decode("hex")).encode("hex")',
     {"v": "hello world!"}, "389b0ba0f64d45d9a86553c8"),
    ('root = this.v.decode("hex").decrypt_aes("ofb",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"000102030405060708090a0b0c0d0e0f".decode("hex")).string()',
     {"v": "389b0ba0f64d45d9a86553c8"}, "hello world!"),
    # cbc (single-block NIST vector; non-UTF8 bytes so compare hex —
    # Go strings carry raw bytes, Python str cannot)
    ('root = this.v.decode("hex").encrypt_aes("cbc",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"000102030405060708090a0b0c0d0e0f".decode("hex")).encode("hex")',
     {"v": "6bc1bee22e409f96e93d7e117393172a"},
     "7649abac8119b246cee98e9b12e9197d"),
    ('root = this.v.decode("hex").decrypt_aes("cbc",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"000102030405060708090a0b0c0d0e0f".decode("hex")).encode("hex")',
     {"v": "7649abac8119b246cee98e9b12e9197d"},
     "6bc1bee22e409f96e93d7e117393172a"),
    # gcm
    ('root = this.v.decode("hex").encrypt_aes("gcm",'
     '"feffe9928665731c6d6a8f9467308308feffe9928665731c6d6a8f94'
     '67308308".decode("hex"),'
     '"54cc7dc2c37ec006bcc6d1da".decode("hex")).encode("hex")',
     {"v": "007c5e5b3e59df24a7c355584fc1518d"},
     "d50b9e252b70945d4240d351677eb10f937cdaef6f2822b6a3191654ba41b197"),
    ('root = this.v.decode("hex").decrypt_aes("gcm",'
     '"feffe9928665731c6d6a8f9467308308feffe9928665731c6d6a8f94'
     '67308308".decode("hex"),'
     '"54cc7dc2c37ec006bcc6d1da".decode("hex")).encode("hex")',
     {"v": "d50b9e252b70945d4240d351677eb10f937cdaef6f2822b6a3191654"
           "ba41b197"},
     "007c5e5b3e59df24a7c355584fc1518d"),
]


@pytest.mark.parametrize("query,doc,want", AES_CASES)
def test_aes_method_parity(query, doc, want):
    from bento_ray.blobl.interp import Message

    msg = Message(structured=doc)
    out = compile_mapping(query).run_batch([msg])
    got = out[0].structured() if out[0]._parsed else out[0].raw
    assert got == want, (query, got, want)


@pytest.mark.parametrize("query,doc,errpart", [
    # "check aes-cbc encryption error"
    ('root = this.v.encrypt_aes("cbc",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"000102030405060708090a0b0c0d0e0f".decode("hex"))',
     {"v": "hello world"}, "plaintext is not a multiple"),
    # "check aes-cbc decryption error"
    ('root = this.v.decode("hex").decrypt_aes("cbc",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"000102030405060708090a0b0c0d0e0f".decode("hex"))',
     {"v": "7649abac81"}, "ciphertext is not a multiple"),
    # bad iv size
    ('root = this.v.encrypt_aes("ctr",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"), "shortiv")',
     {"v": "x"}, "initialisation vector size"),
    # bad key size (crypto/aes error text)
    ('root = this.v.encrypt_aes("ctr", "shortkey",'
     '"000102030405060708090a0b0c0d0e0f".decode("hex"))',
     {"v": "x"}, "invalid key size"),
    # unknown scheme
    ('root = this.v.encrypt_aes("rot13",'
     '"2b7e151628aed2a6abf7158809cf4f3c".decode("hex"),'
     '"000102030405060708090a0b0c0d0e0f".decode("hex"))',
     {"v": "x"}, "unrecognized encryption type"),
    # gcm tampered tag
    ('root = ("00".repeat(17)).decode("hex").decrypt_aes("gcm",'
     '"feffe9928665731c6d6a8f9467308308feffe9928665731c6d6a8f94'
     '67308308".decode("hex"),'
     '"54cc7dc2c37ec006bcc6d1da".decode("hex"))',
     {}, "authentication failed"),
])
def test_aes_method_errors(query, doc, errpart):
    from bento_ray.blobl.interp import BloblangError, Message

    with pytest.raises(BloblangError, match=errpart):
        compile_mapping(query).run_batch([Message(structured=doc)])


# ------------------------------------------- round-3 method additions
# Cases transcribed from the reference specs' doc examples:
# methods_structured.go (split_by, json_schema), xml/bloblang.go
# (format_xml), jsonpath/bloblang_jsonpath.go (json_path),
# pure/bloblang_string.go (parse_form_url_encoded),
# pure/bloblang_time.go (ts_sub + deprecated aliases),
# changelog/bloblang.go (diff/patch), methods_strings.go
# (re_find_all_object), pure/bloblang_numbers.go (trig/pow).
R3_CASES = [
    ('root.words = this.s.split_by(c -> c == " ")',
     {"s": "The quick brown fox"},
     {"words": ["The", "quick", "brown", "fox"]}),
    ('root.tokens = this.t.split_by(c -> c == "," || c == ".")',
     {"t": "foo,bar.baz"}, {"tokens": ["foo", "bar", "baz"]}),
    ('root.segments = this.numbers.split_by(x -> x > 50)',
     {"numbers": [10, 20, 60, 30, 40, 70, 50]},
     {"segments": [[10, 20], [30, 40], [50]]}),
    ('root.all_names = this.json_path("$..name")',
     {"name": "alice", "foo": {"name": "bob"}},
     {"all_names": ["alice", "bob"]}),
    ('root.all_names = this.json_path("$..name")',
     {"thing": ["this", "bar", {"name": "alice"}]},
     {"all_names": ["alice"]}),
    ("""root.text_objects = this.json_path("$.body[?(@.type=='text')]")""",
     {"body": [{"type": "image", "id": "foo"},
               {"type": "text", "id": "bar"}]},
     {"text_objects": [{"type": "text", "id": "bar"}]}),
    ('root.values = this.body.parse_form_url_encoded()',
     {"body": "noise=meow&animal=cat&fur=orange&fur=fluffy"},
     {"values": {"noise": "meow", "animal": "cat",
                 "fur": ["orange", "fluffy"]}}),
    ('root.between = this.started_at.ts_sub("2020-08-14T05:54:23Z")'
     '.abs()',
     {"started_at": "2020-08-13T05:54:23Z"},
     {"between": 86400000000000}),
    ('root = this.format_xml().string()',
     {"foo": {"bar": {"baz": "foo bar baz"}}},
     "<foo>\n    <bar>\n        <baz>foo bar baz</baz>\n    </bar>\n"
     "</foo>"),
    ('root = this.format_xml(no_indent: true).string()',
     {"foo": {"bar": {"baz": "foo bar baz"}}},
     "<foo><bar><baz>foo bar baz</baz></bar></foo>"),
    ('root.m = this.value.re_find_all_object("a(?P<foo>x*)b")',
     {"value": "-axxb-ab-"},
     {"m": [{"0": "axxb", "1": "xx", "foo": "xx"},
            {"0": "ab", "1": "", "foo": ""}]}),
    ('root = this.s.re_replace("ab", "X")', {"s": "ab-ab"}, "X-X"),
    ('root = this.n.cos()', {"n": 0}, 1.0),
    ('root = (2).pow(8)', {}, 256.0),
    ('root = this.t.format_timestamp_unix()',
     {"t": "2020-08-14T05:54:23Z"}, 1597384463),
    ('root = this.t.format_timestamp_unix_nano()',
     {"t": "2020-08-14T05:54:23Z"}, 1597384463000000000),
    ('root = this.t.parse_timestamp_strptime("%Y-%b-%d")',
     {"t": "2020-Aug-14"}, "2020-08-14T00:00:00Z"),
    ('root.d = this.a.diff(this.b)',
     {"a": {"x": 1, "y": [1, 2]}, "b": {"x": 2, "y": [1, 2, 3]}},
     {"d": [{"type": "update", "path": ["x"], "from": 1, "to": 2},
            {"type": "create", "path": ["y", "2"], "from": None,
             "to": 3}]}),
    ('root.p = this.a.patch(this.a.diff(this.b))',
     {"a": {"x": 1, "y": [1, 2]}, "b": {"x": 2, "y": [1, 2, 3]}},
     {"p": {"x": 2, "y": [1, 2, 3]}}),
    # hidden legacy map method (methods.go:335)
    ('root = this.a.map(this + 1)', {"a": 4}, 5),
    # split_by edge: empty string yields [""]
    ('root = this.s.split_by(c -> c == " ")', {"s": ""}, [""]),
]


@pytest.mark.parametrize("query,doc,want", R3_CASES)
def test_round3_method_parity(query, doc, want):
    from bento_ray.blobl.interp import Message

    msg = Message(structured=doc)
    out = compile_mapping(query).run_batch([msg])
    got = out[0].structured() if out[0]._parsed else out[0].raw
    assert got == want, (query, got, want)


def test_parse_parquet_round_trip():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bento_ray.blobl.interp import Message

    buf = io.BytesIO()
    pq.write_table(pa.table({"x": [1, 2], "s": ["a", "b"]}), buf)
    out = compile_mapping('root = content().parse_parquet()') \
        .run_batch([Message(raw=buf.getvalue())])
    assert out[0].structured() == [{"x": 1, "s": "a"},
                                   {"x": 2, "s": "b"}]


def test_json_schema_method():
    from bento_ray.blobl.interp import BloblangError

    ok_q = ('root = this.json_schema("""'
            '{"type":"object","required":["a"]}""")')
    bad_q = ('root = this.json_schema("""'
             '{"type":"object","required":["b"]}""")')
    assert compile_mapping(ok_q).run_value({"a": 1}) == {"a": 1}
    with pytest.raises(BloblangError, match="schema"):
        compile_mapping(bad_q).run_value({"a": 1})
