"""Bloblang compiler unit tests: parser, value semantics, methods,
the distributed mapping stage, and the YAML front-end."""

from __future__ import annotations

import pytest

from bento_ray.blobl import (
    DELETE, BloblangError, Mapping, compile_mapping, go_json_dumps,
    parse_query,
)
from bento_ray.blobl.interp import Message


def run(src, doc, env=None, **kw):
    return compile_mapping(src, **kw).run_value(doc, env=env or {})


# ---------------------------------------------------------------- language

def test_operator_precedence():
    assert run("root.x = 2 + 3 * 4", {}) == {"x": 14}
    assert run("root.x = (2 + 3) * 4", {}) == {"x": 20}
    assert run("root.x = 10 - 2 - 3", {}) == {"x": 5}
    assert run("root.x = 7 % 3", {}) == {"x": 1}
    assert run("root.x = 1 + 2 == 3", {}) == {"x": True}
    assert run('root.x = "a" + "b" + "c"', {}) == {"x": "abc"}


def test_division_always_float():
    # arithmetic.go:176-190 — div degrades to float
    out = run("root.x = 10 / 4", {})
    assert out == {"x": 2.5}
    assert go_json_dumps(run("root.x = 10 / 2", {})) == '{"x":5}'


def test_int_preservation():
    assert go_json_dumps(run("root.x = 2 + 3", {})) == '{"x":5}'
    assert go_json_dumps(run("root.x = [1,2,3].sum()", {})) == '{"x":6}'


def test_coalesce_pipe():
    assert run("root.x = this.a | this.b | 9",
               {"b": 5}) == {"x": 5}
    assert run("root.x = this.a | this.b | 9", {}) == {"x": 9}


def test_missing_field_is_null():
    assert run("root.x = this.nope", {"y": 1}) == {"x": None}


def test_nothing_skips_assignment():
    # if without else → Nothing → assignment skipped (statement.go:50-53);
    # when NO assignment ran at all, the message is left unchanged
    # (executor.go:195-197)
    assert run("root.x = if this.a > 5 { this.a }", {"a": 1}) == {"a": 1}
    assert run("root.x = if this.a > 5 { this.a }", {"a": 9}) == {"x": 9}
    # with a prior root assignment the skipped key stays absent
    assert run("root = {}\nroot.x = if this.a > 5 { this.a }",
               {"a": 1}) == {}


def test_match_rebinding_no_case_keeps_prior_root():
    # windowed.yaml pattern: `root = match {...}` with no matching case
    # leaves the earlier `root = this` intact
    out = run("root = this\nroot = match { this.a > 5 => deleted() }",
              {"a": 1})
    assert out == {"a": 1}


def test_deleted_root_drops_message():
    m = compile_mapping('root = if this.drop { deleted() }')
    assert m.run_value({"drop": True}) is DELETE
    # Nothing → message unchanged
    assert m.run_value({"drop": False}) == {"drop": False}


def test_match_literal_and_bool_cases():
    src = '''root.x = match this.kind {
      "a" => 1
      this.size() > 2 => 2
      _ => 3
    }'''
    # note: match rebinds context to the operand
    assert run('root.x = match this.kind { "a" => 1, _ => 3 }',
               {"kind": "a"}) == {"x": 1}
    assert run('root.x = match this.kind { "a" => 1, _ => 3 }',
               {"kind": "b"}) == {"x": 3}


def test_match_no_case_is_nothing():
    assert run('root = {}\nroot.x = match { this.a > 5 => 1 }',
               {"a": 1}) == {}
    assert run('root.x = match { this.a > 5 => 1 }', {"a": 9}) == {"x": 1}


def test_variables_and_naked_paths():
    out = run('let v = this.a\nroot.b = $v + 1\nc = 7', {"a": 2})
    assert out == {"b": 3, "c": 7}


def test_meta_assignment():
    m = compile_mapping('meta foo = "x"\nroot = this')
    out = m.run_batch([Message.from_content({"a": 1})])
    assert out[0].meta == {"foo": "x"}
    m2 = compile_mapping('meta = deleted()\nroot = this')
    out2 = m2.run_batch([Message.from_content({"a": 1},
                                              meta={"k": "v"})])
    assert out2[0].meta == {}


def test_mutation_mode_preserves_document():
    assert run("root.b = 2", {"a": 1}, is_mutation=True) == \
        {"a": 1, "b": 2}
    assert run("root.a = deleted()", {"a": 1, "b": 2},
               is_mutation=True) == {"b": 2}


def test_string_methods():
    assert run('root.x = "  hi  ".trim().uppercase()', {}) == {"x": "HI"}
    assert run('root.x = "a,b,c".split(",").length()', {}) == {"x": 3}
    assert run('root.x = "hello".slice(1, 3)', {}) == {"x": "el"}
    assert run('root.x = "abc".encode("base64")', {}) == {"x": "YWJj"}
    assert run('root.x = "YWJj".decode("base64").string()', {}) == \
        {"x": "abc"}
    assert run('root.x = "a-b".re_replace_all("-(b)", "_$1")', {}) == \
        {"x": "a_b"}


def test_structured_methods():
    assert run('root.x = {"b":2,"a":1}.keys()', {}) == {"x": ["a", "b"]}
    assert run('root.x = [3,1,2].sort()', {}) == {"x": [1, 2, 3]}
    assert run('root.x = [[1,2],[3]].flatten()', {}) == {"x": [1, 2, 3]}
    assert run('root.x = [1,1,2].unique()', {}) == {"x": [1, 2]}
    assert run('root.x = {"a":{"b":1}}.collapse()', {}) == \
        {"x": {"a.b": 1}}
    assert run('root.x = {"a":1,"b":2}.without("a")', {}) == \
        {"x": {"b": 2}}
    assert run('root = this.map_each_key(key -> key.uppercase())',
               {"a": 1}) == {"A": 1}


def test_merge_collision_makes_array():
    assert run('root = this.a.merge(this.b)',
               {"a": {"x": 1}, "b": {"x": 2, "y": 3}}) == \
        {"x": [1, 2], "y": 3}


def test_catch_and_or():
    assert run('root.x = this.a.uppercase().catch("d")', {}) == {"x": "d"}
    assert run('root.x = this.a.or(5)', {}) == {"x": 5}
    assert run('root.x = this.a.not_null().catch("gone")', {}) == \
        {"x": "gone"}


def test_number_method_with_default():
    assert run('root.x = "12".number()', {}) == {"x": 12}
    assert run('root.x = "nope".number(0)', {}) == {"x": 0}


def test_type_and_string_conversion():
    assert run('root.x = 5.type()', {}) == {"x": "number"}
    assert run('root.x = 2.5.string()', {}) == {"x": "2.5"}
    assert run('root.x = true.string()', {}) == {"x": "true"}


def test_fold_and_enumerated():
    assert run('root.x = [1,2,3].fold(0, tally + value)', {}) == {"x": 6}
    out = run('root.x = ["a","b"].enumerated()', {})
    assert out == {"x": [{"index": 0, "value": "a"},
                         {"index": 1, "value": "b"}]}


def test_timestamp_methods():
    assert run('root.x = "2020-01-02T03:04:05Z".ts_unix()', {}) == \
        {"x": 1577934245}
    out = run('root.x = 1577934245.ts_format()', {})
    assert out == {"x": "2020-01-02T03:04:05Z"}
    out = run('root.x = "2020-01-02T00:00:00Z".ts_add_iso8601("P1D")', {})
    assert out == {"x": "2020-01-03T00:00:00Z"}


def test_parse_csv_method():
    out = run('root = "a,b\\n1,2".parse_csv()', {})
    assert out == [{"a": "1", "b": "2"}]


def test_replace_many():
    out = run('root.x = "a b c".replace_many(["a","x","c","z"])', {})
    assert out == {"x": "x b z"}


def test_zip_and_squash():
    assert run('root.x = [1,2].zip([3,4])', {}) == {"x": [[1, 3], [2, 4]]}
    assert run('root.x = [{"a":1},{"b":2}].squash()', {}) == \
        {"x": {"a": 1, "b": 2}}


def test_error_line_numbers():
    m = compile_mapping('root.a = 1\nroot.b = throw("boom")')
    msgs = m.run_batch([Message.from_content({})], on_error="mark")
    assert msgs[0].error == "failed assignment (line 2): boom"


def test_go_json_float_formatting():
    assert go_json_dumps({"a": 5.0}) == '{"a":5}'
    assert go_json_dumps({"a": 0.57}) == '{"a":0.57}'
    assert go_json_dumps({"b": 1, "a": 2}) == '{"a":2,"b":1}'


def test_interpolated_field():
    from bento_ray.config.field import InterpolatedField

    f = InterpolatedField('${! json("a") }:${! meta("m") }')
    msg = Message.from_content({"a": "x"}, meta={"m": "y"})
    assert f.resolve_message(0, [msg], {}) == "x:y"


def test_env_interpolation():
    from bento_ray.config.envsubst import interpolate_env

    assert interpolate_env("v=${FOO:def}", {}) == "v=def"
    assert interpolate_env("v=${FOO:def}", {"FOO": "x"}) == "v=x"
    assert interpolate_env("v=${! json() }", {}) == "v=${! json() }"
    assert interpolate_env("$${FOO}", {"FOO": "x"}) == "${FOO}"


# ----------------------------------------------------------- Ray stage

def test_mapping_stage_structured(ray_session):
    import ray.data as rd

    from bento_ray.blobl.stage import mapping_stage

    ds = rd.from_items([{"a": i, "b": f"s{i}"} for i in range(100)])
    out = mapping_stage(
        ds, 'root.a2 = this.a * 2\nroot.up = this.b.uppercase()'
            '\nroot = if this.a % 10 == 0 { deleted() }',
        concurrency=2).materialize()
    df = out.to_pandas().sort_values("a2").reset_index(drop=True)
    assert len(df) == 90
    assert df["a2"].tolist()[0] == 2
    assert df["up"].tolist()[0] == "S1"


def test_mapping_stage_content(ray_session):
    import ray.data as rd

    from bento_ray.blobl.stage import mapping_stage

    ds = rd.from_items([{"content": '{"n": %d}' % i, "k": i}
                        for i in range(20)])
    out = mapping_stage(ds, 'root.n = this.n + 1', mode="content",
                        concurrency=2).materialize()
    df = out.to_pandas().sort_values("k")
    assert df["content"].tolist()[0] == '{"n":1}'
    assert "k" in df.columns


def test_pipeline_from_yaml(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bento_ray.pipelines.builder import Pipeline

    pq.write_table(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}),
                   str(tmp_path / "t.parquet"))
    yml = f"""
input:
  parquet:
    path: {tmp_path}/t.parquet
pipeline:
  processors:
    - mapping: |
        root.a = this.a * ${{MULT:10}}
        root.b = this.b.uppercase()
"""
    df = Pipeline.from_yaml(yml, env={}).to_pandas().sort_values("a")
    assert df["a"].tolist() == [10, 20, 30]
    assert df["b"].tolist() == ["X", "Y", "Z"]


# ------------------------------------------------------- jq / jmespath

def test_jq_reference_cases():
    """Cases from processor_jq_test.go:95-160."""
    from bento_ray.jqlang import jq_first

    assert jq_first(".foo.bar", {"foo": {"bar": {"baz": 1}}}) == {"baz": 1}
    assert jq_first(".baz.qux", {"foo": 1}) is None
    assert jq_first("[.ts,.id,.msg] | @csv",
                    {"id": "1054fe28", "msg": 'sample "log"',
                     "ts": 1641393111}) == \
        '1641393111,"1054fe28","sample ""log"""'
    assert jq_first('{foo: .foo} | .foo.bar = "baz"',
                    {"foo": {"original": {"content": "is this"}}}) == \
        {"foo": {"original": {"content": "is this"}, "bar": "baz"}}


def test_jq_streams_and_builtins():
    from bento_ray.jqlang import JQ, jq_first

    assert JQ(".[] | select(.a > 1)")([{"a": 1}, {"a": 2}]) == [{"a": 2}]
    assert jq_first("map(.a) | add", [{"a": 1}, {"a": 2}]) == 3
    assert jq_first(".a // 5", {}) == 5
    assert jq_first(".a | keys", {"a": {"z": 1, "b": 2}}) == ["b", "z"]
    assert JQ(".a[]")({"a": [1, 2]}) == [1, 2]
    assert jq_first(".missing[]?", {}) is None


def test_jq_processor_semantics():
    from bento_ray.blobl.interp import Message
    from bento_ray.config.processors import JQProcessor, Runtime

    p = JQProcessor(query=".items[]")
    out = p.process_batch(
        [Message.from_content({"items": [1, 2, 3]})], Runtime())
    # >1 emitted values collapse into an array (processor_jq.go:227-231)
    assert out[0][0].structured() == [1, 2, 3]
    p2 = JQProcessor(query=".missing | select(. != null)")
    assert p2.process_batch(
        [Message.from_content({"x": 1})], Runtime()) == []


def test_jmespath_reference_cases():
    """Cases from processor_jmespath_test.go:114-162."""
    from bento_ray.jmespath_mini import search

    assert search("foo.bar", {"foo": {"bar": {"baz": 1}}}) == {"baz": 1}
    assert search("sum([foo.bar, `6`])", {"foo": {"bar": 123}}) == 129
    assert search("{foo: merge(foo, {bar:'baz'})}",
                  {"foo": {"a": 1}}) == {"foo": {"a": 1, "bar": "baz"}}


def test_jmespath_projections():
    from bento_ray.jmespath_mini import search

    assert search("items[*].name",
                  {"items": [{"name": "a"}, {"name": "b"}]}) == ["a", "b"]
    assert search("items[?price > `10`].name",
                  {"items": [{"name": "a", "price": 5},
                             {"name": "b", "price": 20}]}) == ["b"]
    assert search("sort_by(items, &age)[0].name",
                  {"items": [{"name": "x", "age": 3},
                             {"name": "y", "age": 1}]}) == "y"


# ------------------------------------------------------------ vectorizer

def _vec_and_interp(src, table):
    """Run a mapping both via the Arrow vectorizer and the row-wise
    interpreter; both must agree."""
    import pyarrow as pa

    from bento_ray.blobl.interp import Mapping
    from bento_ray.blobl.vectorize import compile_vectorized

    m = Mapping(src)
    vec = compile_vectorized(m)
    got = vec(table)
    rows = table.to_pylist()
    want = [m.run_value(r) for r in rows]
    got_rows = got.to_pylist()
    assert got_rows == want, (got_rows, want)
    return got


def test_vectorizer_arithmetic_and_if():
    import pyarrow as pa

    t = pa.table({"a": [1, 2, 3], "b": [10.0, 20.0, 30.0]})
    _vec_and_interp(
        "root.s = this.a + 1\n"
        "root.p = this.b * (1.0 - 0.5)\n"
        "root.big = if this.a > 1 { \"big\" } else { \"small\" }", t)


def test_vectorizer_division_is_float():
    import pyarrow as pa

    t = pa.table({"a": [10, 7]})
    out = _vec_and_interp("root.q = this.a / 2", t)
    assert str(out.schema.field("q").type) == "double"


def test_vectorizer_string_methods_and_concat():
    import pyarrow as pa

    t = pa.table({"s": ["a", "bc"]})
    _vec_and_interp(
        'root.u = this.s.uppercase()\n'
        'root.n = this.s.length()\n'
        'root.j = this.s + "!"', t)


def test_vectorizer_rejects_complex_mappings():
    import pytest as _pytest

    from bento_ray.blobl.interp import Mapping
    from bento_ray.blobl.vectorize import (
        NotVectorizable, compile_vectorized,
    )

    for src in ["root = this", "root.x = this.a.b",
                "root.x = match { this.a > 1 => 1 }",
                "root.x = this.items.map_each(i -> i)",
                "meta x = 1\nroot.y = 2",
                "root.x = if this.a > 1 { 1 }"]:
        with _pytest.raises(NotVectorizable):
            compile_vectorized(Mapping(src))


def test_bench_revenue_mapping_is_vectorized():
    """The driver-bench mapping (q_bloblang_revenue) MUST take the
    compiled Arrow path — a compiler regression that demotes it to the
    per-row interpreter triples the bench time with no other signal."""
    import pyarrow as pa

    from bento_ray.blobl.stage import MappingStage
    from bento_ray.pipelines.queries import BLOBLANG_REVENUE_MAPPING

    st = MappingStage(BLOBLANG_REVENUE_MAPPING)
    assert st.vectorized is not None
    t = pa.table({"l_returnflag": ["A", "N"], "l_quantity": [40.0, 1.0],
                  "l_extendedprice": [100.0, 50.0],
                  "l_discount": [0.1, 0.0]})
    out = _vec_and_interp(BLOBLANG_REVENUE_MAPPING, t)
    assert out.column_names == ["flag", "revenue", "size_class"]


def test_mapping_stage_uses_vectorizer():
    from bento_ray.blobl.stage import MappingStage

    st = MappingStage("root.x = this.a * 2")
    assert st.vectorized is not None
    st2 = MappingStage("root = this.map_each_key(k -> k)")
    assert st2.vectorized is None


def test_generate_input_yaml(ray_session):
    from bento_ray.pipelines.builder import Pipeline

    yml = """
input:
  generate:
    count: 50
    mapping: |
      root.n = random_int(seed: 7, max: 99)
      root.fixed = "x"
pipeline:
  processors:
    - mapping: 'root.n2 = this.n * 2\nroot.fixed = this.fixed'
"""
    df = Pipeline.from_yaml(yml, env={}).to_pandas()
    assert len(df) == 50
    assert (df["fixed"] == "x").all()
    assert (df["n2"] % 2 == 0).all()


def test_awk_reference_case():
    """awk.yaml: json_set_int + json_get + metadata_get arithmetic."""
    from bento_ray.awklang import AWK

    prog = AWK('{ json_set_int("result", json_get("result") + '
               'metadata_get("foo") + metadata_get("bar")); }',
               codec="text")
    content, meta, _doc = prog.run_message(
        b'{"result":10}', {"foo": "5", "bar": "7"})
    import json as _json

    assert _json.loads(content) == {"result": 22}
    assert meta == {"foo": "5", "bar": "7"}


def test_awk_print_and_fields():
    from bento_ray.awklang import AWK

    prog = AWK('{ print $2 " says " toupper($1) }')
    content, _, _ = prog.run_message(b"hello world", {})
    assert content == b"world says HELLO"


def test_awk_json_codec_variables():
    from bento_ray.awklang import AWK

    prog = AWK('{ print foo_bar_value + 1 }', codec="json")
    content, _, _ = prog.run_message(
        b'{"foo":{"bar":{"value":10}}}', {})
    assert content == b"11"


def test_awk_control_flow():
    from bento_ray.awklang import AWK

    prog = AWK('{ s = 0; for (i = 1; i <= 4; i++) { s += i }; '
               'if (s > 5) { print "big", s } else { print "small" } }')
    content, _, _ = prog.run_message(b"x", {})
    assert content == b"big 10"


def test_proto_runtime_compilation():
    """protoschema: .proto text → descriptors without protoc."""
    from google.protobuf import json_format

    from bento_ray.protoschema import SchemaSet

    ss = SchemaSet(["/root/reference/config/test/protobuf/schema"])
    House = ss.message_class("testing.House")
    h = json_format.Parse(
        '{"people":[{"firstName":"a","age":3}],"address":"12 Main"}',
        House())
    blob = h.SerializeToString()
    h2 = House()
    h2.ParseFromString(blob)
    assert h2.address == "12 Main"
    assert h2.people[0].first_name == "a"


def test_lambda_sees_outer_this():
    """Inside a named-context lambda `this` stays the mapping context
    (NamedContextFunction pops only the pushed element)."""
    out = run('root.y = this.arr.map_each(v -> v + this.off)',
              {"arr": [1, 2], "off": 10})
    assert out == {"y": [11, 12]}


def test_find_is_value_compare_and_find_by_predicate():
    """find() compares values (methods_structured.go:443 doc example);
    find_by takes the predicate."""
    doc = {"goal": "bar", "things": ["foo", "bar", "baz"]}
    assert run('root.i = this.things.find(this.goal)', doc) == {"i": 1}
    assert run('root.i = this.things.find("nope")', doc) == {"i": -1}
    assert run('root.i = this.things.find_by(v -> v.length() == 3)',
               doc) == {"i": 0}
    assert run('root.i = this.things.find_all_by(v -> v.has_prefix("b"))',
               doc) == {"i": [1, 2]}


def test_parse_duration_iso8601_nanoseconds():
    # bloblang_time.go:166-198 — nanoseconds
    assert run('root.d = "PT2H".parse_duration_iso8601()', {}) == \
        {"d": 7_200_000_000_000}


def test_modulo_exact_past_2_53():
    assert run('root.r = this.n % 10',
               {"n": 9223372036854775807}) == {"r": 7}
    assert run('root.r = -7 % 3', {}) == {"r": -1}


def test_parse_xml_preserves_equals_in_text():
    assert run('root = this.x.parse_xml()',
               {"x": "<note>a b=c</note>"}) == {"note": "a b=c"}


def test_review2_regressions():
    """Second review pass: jq `?` catches any error; jq int division
    and trunc-modulo; jmespath index-after-projection; vectorizer
    rejects %, interpreter computes it."""
    from bento_ray.jqlang import JQ, jq_first

    assert JQ(".a | tonumber?")({"a": "x"}) == []
    assert jq_first("4 / 2", None) == 2 and \
        isinstance(jq_first("4 / 2", None), int)
    assert jq_first("5 / 2", None) == 2.5
    assert jq_first("-5 % 3", None) == -2
    assert JQ("(1 % 0)?")(None) == []

    from bento_ray.jmespath_mini import search

    assert search("foo[*][0]", {"foo": [[1, 2], [3, 4]]}) == [1, 3]

    from bento_ray.blobl.interp import Mapping
    from bento_ray.blobl.vectorize import (
        NotVectorizable, compile_vectorized,
    )
    import pytest as _pytest

    with _pytest.raises(NotVectorizable):
        compile_vectorized(Mapping("root.x = this.a % 3"))
    # interpreter still computes it (through the stage fallback)
    assert run("root.x = this.a % 3", {"a": 7}) == {"x": 1}


def test_scanner_lines_semantics():
    from bento_ray.sources.scanners import lines

    assert list(lines()(b"a\nb\n")) == [b"a", b"b"]
    assert list(lines()(b"a\n\nb")) == [b"a", b"", b"b"]
    assert list(lines()(b"")) == []


def test_awk_trailing_newline_and_sprintf_hex():
    from bento_ray.awklang import AWK

    c, _, _ = AWK("{ n += 1 } END { print n }",
                  codec="text").run_message(b"a\nb\n", {})
    assert c == b"2"
    c2, _, _ = AWK('{ print sprintf("%x|%05d", 255, 7) }').run_message(
        b"x", {})
    assert c2 == b"ff|00007"


def test_rfc3164_single_digit_day():
    import datetime

    from bento_ray.logparse import parse_rfc3164

    y = datetime.datetime.now().year
    out = parse_rfc3164("<34>Oct 5 10:11:12 host app: msg")
    assert out["timestamp"] == f"{y}-10-05T10:11:12Z"


def test_protoschema_enums_and_packageless(tmp_path):
    from google.protobuf import json_format

    from bento_ray.protoschema import SchemaSet

    (tmp_path / "a.proto").write_text(
        "syntax = \"proto3\";\n"
        "enum Color { RED = 0; BLUE = 1; }\n"
        "message Paint { Color color = 1; }\n"
        "message Outer { Paint p = 1; }\n")
    ss = SchemaSet([str(tmp_path)])
    Outer = ss.message_class("Outer")
    o = json_format.Parse('{"p":{"color":"BLUE"}}', Outer())
    assert Outer.FromString(o.SerializeToString()).p.color == 1


def test_counter_function_reference_examples():
    """counter() (impl/pure/bloblang_general.go:16-160): doc examples
    — per-instantiation state, map reuse, set: reset/peek semantics,
    max wraparound."""
    from bento_ray.blobl.interp import Mapping

    def seq(src, docs, ctr):
        outs = []
        m = _COMPILED.setdefault(src, Mapping(src))
        for d in docs:
            out = m.run_batch([Message.from_content(d)], env={},
                              counters=ctr)
            outs.append(out[0].structured())
        return outs

    _COMPILED: dict = {}
    assert seq('root.id = counter()', [{}, {}], {}) == [
        {"id": 1}, {"id": 2}]
    two_per_msg = ('map foos {\n  root = counter()\n}\n'
                   'root.meow_id = null.apply("foos")\n'
                   'root.woof_id = null.apply("foos")')
    assert seq(two_per_msg, [{}, {}], {}) == [
        {"meow_id": 1, "woof_id": 2}, {"meow_id": 3, "woof_id": 4}]
    doggos = ('root.consecutive_doggos = counter(min: 1, '
              'set: if !this.sound.lowercase().contains("woof") { 0 })')
    assert [r["consecutive_doggos"] for r in seq(
        doggos, [{"sound": "woof woof"}, {"sound": "woofer wooooo"},
                 {"sound": "meow"},
                 {"sound": "uuuuh uh uh woof uhhhhhh"}], {})] == \
        [1, 2, 0, 1]
    peek = 'root.things = counter(set: if this.id == null { null })'
    assert [r["things"] for r in seq(
        peek, [{"id": "a"}, {"id": "b"}, {"what": "x"}, {"id": "c"}],
        {})] == [1, 2, 2, 3]
    wrap = 'root.n = counter(min: 2, max: 4)'
    assert [r["n"] for r in seq(wrap, [{}] * 6, {})] == \
        [2, 3, 4, 2, 3, 4]
    # two instantiations in one mapping are independent
    indep = 'root.a = counter()\nroot.b = counter()'
    assert seq(indep, [{}, {}], {}) == [
        {"a": 1, "b": 1}, {"a": 2, "b": 2}]


def test_pi_cosine_similarity_tracing_file(tmp_path):
    """pi() (bloblang_numbers.go:249), cosine_similarity()
    (bloblang_numbers_v2.go:35-92), tracing_* zero values
    (functions.go), file()/file_rel() (io/bloblang.go:82,135)."""
    from bento_ray.blobl.interp import Mapping

    def run1(src, doc=None):
        out = Mapping(src).run_batch(
            [Message.from_content(doc or {})], env={}, counters={},
            on_error="mark")
        m = out[0]
        return m.structured() if m.error is None else ("ERR", m.error)

    assert run1('root.radians = this.degrees * (pi() / 180)',
                {"degrees": 45}) == {"radians": 0.7853981633974483}
    assert run1('root.s = cosine_similarity([1, 2, 3], [2, 4, 6])') \
        == {"s": 1.0}
    assert run1('root.s = cosine_similarity([1, 0], [0, 1])') == \
        {"s": 0.0}
    assert "equal length" in run1(
        'root.s = cosine_similarity([1, 0], [0, 1, 2])')[1]
    assert "all zeros" in run1(
        'root.s = cosine_similarity([0, 0], [0, 0])')[1]
    assert "numeric types" in run1(
        'root.s = cosine_similarity([1, "a"], [1, 2])')[1]
    assert run1('root.t = tracing_id()') == \
        {"t": "00000000000000000000000000000000"}
    assert run1('root.t = tracing_span()') == {"t": None}
    p = tmp_path / "doc.json"
    p.write_text('{"foo":"bar"}')
    assert run1(f'root.doc = file("{p}").parse_json()') == \
        {"doc": {"foo": "bar"}}
    p.unlink()
    # static cache: file already read once keeps yielding
    assert run1(f'root.doc = file("{p}").parse_json()') == \
        {"doc": {"foo": "bar"}}
    assert "ERR" == run1(
        f'root.doc = file(path: "{p}", no_cache: true)')[0]


def test_jq_values_is_null_filter():
    """jq `values` means select(. != null) — not 'object values'."""
    from bento_ray.jqlang import JQ

    assert JQ(".foo | values")({"foo": None}) == []
    assert JQ(".foo | values")({"foo": 3}) == [3]
    assert JQ("values")({"a": 1}) == [{"a": 1}]


def test_format_xml_escapes_special_chars():
    from bento_ray.blobl import compile_mapping

    out = compile_mapping(
        'root = {"doc": {"-attr": "x\\"y", "#text": "a < b & c"}}'
        '.format_xml().string()').run_value({})
    assert out == '<doc attr="x&quot;y">a &lt; b &amp; c</doc>'


def test_random_int_seeded_sequence_varies():
    """A seeded random_int draws a SEQUENCE, not the same value for
    every message (the reference seeds one RNG per instantiation)."""
    from bento_ray.blobl import compile_mapping

    m = compile_mapping("root.v = random_int(seed: 987)")
    vals = [m.run_value({})["v"] for _ in range(8)]
    assert len(set(vals)) > 1


def test_int_width_casts_range_checked():
    from bento_ray.blobl import compile_mapping
    from bento_ray.blobl.values import BloblangError

    assert compile_mapping("root.a = (120).int8()").run_value({}) == \
        {"a": 120}
    assert compile_mapping("root.a = (-128).int8()").run_value({}) == \
        {"a": -128}
    for bad in ["(200).int8()", "(-300).int8()", "(70000).int16()",
                "(5000000000).uint32()", "(-1).uint32()"]:
        with pytest.raises(BloblangError, match="capacity"):
            compile_mapping(f"root.a = {bad}").run_value({})


def test_catch_lambda_binds_error():
    from bento_ray.blobl import compile_mapping

    out = compile_mapping(
        'root.msg = this.p.parse_json().catch(e -> "failed: " + e)'
    ).run_value({"p": "{bad"})
    assert out["msg"].startswith("failed: ")
    assert "failed to parse" in out["msg"]


def test_awk_field_numeric_comparison_posix_strnum():
    """Two numeric-looking FIELDS compare numerically ('10' > '9' on
    fields is true); string literals still compare as strings."""
    from bento_ray.awklang import AWK

    out, _, _ = AWK('$1 > $2 {print "gt"}').run_message(b"10 9", {})
    assert out == b"gt"
    out2, _, _ = AWK(
        'BEGIN { if ("10" > "9") print "sg"; else print "sl" }'
    ).run_message(b"", {})
    assert out2 == b"sl"  # literal strings: "1" < "9"


def test_awk_substr_clamps_start():
    from bento_ray.awklang import AWK

    out, _, _ = AWK('{print substr("hello", 0, 3), substr("hello", 0),'
                    ' substr("hello", 2, 3), substr("hello", -1, 3)}'
                    ).run_message(b"x", {})
    assert out == b"he hello ell h"


def test_vectorized_null_and_divzero_parity(ray_session):
    """The vectorized mapping path must agree with the row-wise
    interpreter on nulls (null == null is true in Bloblang, null in
    Arrow) and error — not inf — on division by zero."""
    import ray.data as rd

    from bento_ray.blobl.stage import mapping_stage

    ds = rd.from_items([{"a": None, "b": None, "x": 1.0, "y": 2.0},
                        {"a": 1, "b": 2, "x": 4.0, "y": 0.0}])
    eq = mapping_stage(ds, "root.eq = this.a == this.b").to_pandas()
    assert eq["eq"].tolist() == [True, False]

    # y=0 row: the interpreter marks the message errored (row keeps
    # its original shape) — no silent inf anywhere in the output
    r = mapping_stage(ds, "root.r = this.x / this.y").to_pandas()
    import numpy as np
    assert not np.isinf(r.select_dtypes("number").to_numpy()).any()

    # type-mismatched op: per-message error, the Ray task survives
    ds2 = rd.from_items([{"name": "a", "count": 2}])
    out = mapping_stage(ds2, "root.s = this.name + this.count").to_pandas()
    assert len(out) == 1


def test_proto_negative_enum_and_oneof():
    """Negative enum values keep their sign (the tokenizer dropped
    '-'); oneof members flatten into wire-compatible singular fields
    instead of a misleading parse error."""
    from bento_ray.protoschema import parse_proto

    fdp = parse_proto(
        'syntax = "proto3"; message M { oneof kind { int32 a = 1; '
        'string b = 2; } enum E { Z = 0; NEG = -5; } }', "t.proto")
    m = fdp.message_type[0]
    assert [(f.name, f.number) for f in m.field] == [("a", 1), ("b", 2)]
    assert m.enum_type[0].value[1].number == -5
