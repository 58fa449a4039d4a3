"""The ``javascript`` processor and its ES5-subset engine.

The processor cases mirror the reference's
internal/impl/javascript/processor_test.go verbatim (Basic,
NoEncapsulation, Metadata, Structured, StructuredImut, ErrorHandling,
BasicFromFile, BasicFromModule, HTTPFetch — the last via the injectable
fetch hook since this runtime has no network); the language cases pin
the engine's JS semantics (coercion, ASI, closures, methods).
"""

from __future__ import annotations

import pytest

from bento_ray import jslang
from bento_ray.blobl.interp import Message
from bento_ray.config.processors import (
    JavascriptProcessor, Runtime, build_processor,
)


def run_js(src: str):
    """Evaluate a standalone program, returning its completion value."""
    return jslang.Interp().run(jslang.compile_js(src))


# ---------------------------------------------------------------------------
# Language semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("src,want", [
    ("1 + 2 * 3", 7),
    ("(1 + 2) * 3", 9),
    ("7 / 2", 3.5),
    ("4 / 2", 2),                              # integral double → int
    ("7 % 3", 1),
    ("2 ** 10", 1024),
    ('"a" + "b"', "ab"),
    ('"n=" + 5', "n=5"),
    ("5 + true", 6),
    ('"5" - 1', 4),
    ('"5" + 1', "51"),
    ("1 < 2 && 2 < 3", True),
    ("null == undefined", True),
    ("null === undefined", False),
    ('1 == "1"', True),
    ('1 === "1"', False),
    ("!0", True),
    ("typeof 1", "number"),
    ('typeof "x"', "string"),
    ("typeof undefined", "undefined"),
    ("typeof {}", "object"),
    ("typeof []", "object"),
    ("typeof nope", "undefined"),              # undeclared is safe
    ("typeof (() => 1)", "function"),
    ("1 > 2 ? 'a' : 'b'", "b"),
    ("[1,2,3].length", 3),
    ('"hello".length', 5),
    ("({a: 1}).a", 1),
    ("({a: 1})['a']", 1),
    ("({a: {b: [0, 5]}}).a.b[1]", 5),
    ("5 | 0", 5),
    ("5 & 3", 1),
    ("1 << 4", 16),
    ("-7 >> 1", -4),
    ('"b" in {a:1, b:2}', True),
    ("0 in [9]", True),
    ("void 0 === undefined", True),
    ("~5", -6),
    ("+‍'12'".replace("‍", ""), 12),
    ("(1, 2, 3)", 3),
])
def test_expression_semantics(src, want):
    assert run_js(src) == want


def test_statements_loops_closures():
    assert run_js("""
        function counter() {
          let n = 0;
          return function() { n++; return n; };
        }
        let c = counter();
        c(); c();
        c()
    """) == 3
    assert run_js("""
        let total = 0;
        for (let i = 0; i < 10; i++) {
          if (i % 2 === 0) continue;
          if (i > 7) break;
          total += i;
        }
        total
    """) == 1 + 3 + 5 + 7
    assert run_js("""
        let out = [];
        for (const x of [10, 20, 30]) out.push(x + 1);
        for (const k in {a: 1, b: 2}) out.push(k);
        out.join(",")
    """) == "11,21,31,a,b"
    assert run_js("""
        let i = 0, seen = [];
        do { seen.push(i); i++; } while (i < 3)
        seen.length
    """) == 3
    assert run_js("""
        function f(x) {
          switch (x) {
            case 1: return "one";
            case 2:
            case 3: return "two-or-three";
            default: return "many";
          }
        }
        f(1) + "," + f(3) + "," + f(9)
    """) == "one,two-or-three,many"


def test_asi_newline_termination():
    # the reference's own test programs omit semicolons after let
    assert run_js("""
        let foo = "hello world"
        let bar = foo + "!"
        bar
    """) == "hello world!"


def test_try_catch_finally_throw():
    assert run_js("""
        let log = [];
        try {
          try { throw "boom"; }
          finally { log.push("fin"); }
        } catch (e) { log.push("caught:" + e); }
        log.join("|")
    """) == "fin|caught:boom"
    assert run_js("""
        try { null.x; } catch (e) { "caught" }
    """) == "caught"
    assert run_js("""
        try { throw new Error("bad"); }
        catch (e) { e.message + "/" + e.name }
    """) == "bad/Error"


def test_arrow_functions_and_iife():
    assert run_js("(() => 42)()") == 42
    assert run_js("((a, b) => a + b)(1, 2)") == 3
    assert run_js("(x => x * 2)(21)") == 42
    assert run_js("""
        let result = 0;
        (() => { result = 7; })();
        result
    """) == 7


def test_builtin_objects():
    assert run_js('Object.keys({a:1, b:2}).length') == 2
    assert run_js('Object.values({a:1, b:2})[1]') == 2
    assert run_js('Object.assign({}, {a:1}, {b:2}).b') == 2
    assert run_js('JSON.stringify({a:"x", n:2})') == '{"a":"x","n":2}'
    assert run_js('JSON.parse("[1, 2]")[1]') == 2
    assert run_js("Math.floor(3.7)") == 3
    assert run_js("Math.max(1, 9, 4)") == 9
    assert run_js('parseInt("42abc")') == 42
    assert run_js('parseFloat("2.5x")') == 2.5
    assert run_js('isNaN("zz")') is True
    assert run_js("Array.isArray([1])") is True
    assert run_js("Array.isArray({})") is False
    assert run_js("String(12) + Number('3') + Boolean(0)") == "123false"


def test_array_and_string_methods():
    assert run_js("[3,1,2].sort().join('-')") == "1-2-3"
    assert run_js("[1,2,3,4].filter(x => x % 2 === 0).map(x => x * 10)"
                  ".join(',')") == "20,40"
    assert run_js("[1,2,3].reduce((a, x) => a + x, 10)") == 16
    assert run_js("[1,[2,[3]]].flat(2).length") == 3
    assert run_js("[5,6,7].indexOf(6)") == 1
    assert run_js("[5,6].includes(7)") is False
    assert run_js("let a=[1]; a.push(2, 3); a.length") == 3
    assert run_js("[1,2,3,4].slice(1, 3).join('')") == "23"
    assert run_js("[1,2,3,4].slice(-2).join('')") == "34"
    assert run_js('"a,b,c".split(",").length') == 3
    assert run_js('"  x  ".trim()') == "x"
    assert run_js('"abc".toUpperCase()') == "ABC"
    assert run_js('"abcabc".replace("b", "X")') == "aXcabc"
    assert run_js('"abcabc".replaceAll("b", "X")') == "aXcaXc"
    assert run_js('"abc".slice(1)') == "bc"
    assert run_js('"abcdef".substring(4, 1)') == "bcd"
    assert run_js('"ha".repeat(3)') == "hahaha"
    assert run_js('"7".padStart(3, "0")') == "007"
    assert run_js('"x".charCodeAt(0)') == 120
    assert run_js("(200).toString()") == "200"
    assert run_js("(255).toString(16)") == "ff"
    assert run_js("(1.005).toFixed(1)") == "1.0"
    assert run_js("(123.4).toString()") == "123.4"


def test_template_literals():
    assert run_js('let n = 3; `n is ${n}, sq ${n * n}`') == \
        "n is 3, sq 9"


def test_number_normalization_matches_goja_export():
    # goja exports integral doubles as int64 — our JSON marshal must
    # therefore print 2, not 2.0 (pinned by TestProcessorStructured)
    v = run_js("Object.keys({a:1,b:2}).length")
    assert isinstance(v, int)
    assert jslang.js_json_stringify({"n": run_js("8 / 4")}) == '{"n":2}'


# ---------------------------------------------------------------------------
# Processor parity (processor_test.go)
# ---------------------------------------------------------------------------


IIFE_APPEND = """
(() => {
  let foo = "hello world"
  bento.v0_msg_set_string(bento.v0_msg_as_string() + foo);
})();
"""


def run_proc(proc, *contents):
    batches = proc.process_batch(
        [Message.from_content(c) for c in contents], Runtime())
    assert len(batches) == 1
    return batches[0]


def test_processor_basic():
    p = build_processor({"javascript": {"code": IIFE_APPEND}})
    out = run_proc(p, "first ", "second ")
    assert [m.content_bytes().decode() for m in out] == \
        ["first hello world", "second hello world"]
    assert all(m.error is None for m in out)


def test_processor_no_encapsulation():
    p = build_processor({"javascript": {
        "code": 'bento.v0_msg_set_string('
                'bento.v0_msg_as_string() + "hello world");'}})
    out = run_proc(p, "first ", "second ")
    assert [m.content_bytes().decode() for m in out] == \
        ["first hello world", "second hello world"]


def test_processor_metadata():
    p = build_processor({"javascript": {"code": """
(() => {
  bento.v0_msg_set_meta("testa", "hello world");
  bento.v0_msg_set_meta("testb", bento.v0_msg_get_meta("testa") + " two");
  bento.v0_msg_set_meta("testc", ["first","second"]);
  bento.v0_msg_set_meta("testd", 123.4);
})();
"""}})
    (m,) = run_proc(p, "first")
    assert m.content_bytes() == b"first"
    assert m.meta["testa"] == "hello world"
    assert m.meta["testb"] == "hello world two"
    assert m.meta["testc"] == ["first", "second"]
    assert m.meta["testd"] == 123.4


def test_processor_exists_meta():
    p = build_processor({"javascript": {"code": """
(() => {
  if (bento.v0_msg_exists_meta("have")) {
    bento.v0_msg_set_string("yes");
  } else {
    bento.v0_msg_set_string("no");
  }
})();
"""}})
    m = Message.from_content("x")
    m.meta["have"] = "1"
    batches = p.process_batch([m, Message.from_content("y")], Runtime())
    assert [x.content_bytes().decode() for x in batches[0]] == \
        ["yes", "no"]


def test_processor_structured():
    p = build_processor({"javascript": {"code": """
(() => {
  let thing = bento.v0_msg_as_structured();
  thing.num_keys = Object.keys(thing).length;
  delete thing["b"];
  bento.v0_msg_set_structured(thing);
})();
"""}})
    (m,) = run_proc(p, '{"a":"a value","b":"b value"}')
    assert m.content_bytes() == b'{"a":"a value","num_keys":2}'


def test_processor_structured_imut():
    # mutating the exported structure must NOT touch the message
    # (goja exports a copy into JS values — vm.go / casts.go)
    p = build_processor({"javascript": {"code": """
(() => {
  let thing = bento.v0_msg_as_structured();
  thing.num_keys = Object.keys(thing).length;
  delete thing["b"];
  bento.v0_msg_set_meta("result", thing);
})();
"""}})
    (m,) = run_proc(p, '{"a":"a value","b":"b value"}')
    assert m.content_bytes() == b'{"a":"a value","b":"b value"}'
    assert m.meta["result"] == {"a": "a value", "num_keys": 2}
    assert isinstance(m.meta["result"]["num_keys"], int)


def test_processor_error_handling():
    # host errors are thrown as plain JS STRING values (vm.go:63)
    p = build_processor({"javascript": {"code": """
(() => {
  try {
    let thing = bento.v0_msg_as_structured();
    bento.v0_msg_set_meta("no_err", thing);
  } catch (e) {
    bento.v0_msg_set_meta("err", e);
  }
})();
"""}})
    (m,) = run_proc(p, "not a structured message")
    assert m.content_bytes() == b"not a structured message"
    assert m.error is None
    assert list(m.meta) == ["err"]
    assert isinstance(m.meta["err"], str)
    assert "json" in m.meta["err"].lower() or \
        "expecting" in m.meta["err"].lower()


def test_processor_uncaught_error_flags_batch():
    p = build_processor({"javascript": {"code": "nope.nope();"}})
    out = run_proc(p, "a", "b")
    assert all(m.error for m in out)


def test_processor_basic_from_file(tmp_path):
    f = tmp_path / "foo.js"
    f.write_text(IIFE_APPEND)
    p = build_processor({"javascript": {"file": str(f)}})
    out = run_proc(p, "first ")
    assert out[0].content_bytes() == b"first hello world"


def test_processor_basic_from_module(tmp_path):
    (tmp_path / "blobber.js").write_text("""
function blobber() {
    return 'blobber module';
}

module.exports = blobber;
""")
    p = build_processor({"javascript": {
        "code": """
(() => {
  const blobber = require('blobber');

  bento.v0_msg_set_string(bento.v0_msg_as_string() + blobber());
})();
""",
        "global_folders": [str(tmp_path)]}})
    out = run_proc(p, "hello ")
    assert out[0].content_bytes() == b"hello blobber module"


def test_processor_module_missing():
    p = build_processor({"javascript": {
        "code": "require('nothere');"}})
    (m,) = run_proc(p, "x")
    assert "was not found" in m.error


def test_processor_http_fetch_hook():
    # TestProcessorHTTPFetch with the injectable hook standing in for
    # httptest (no network in this runtime)
    def fake_fetch(url, headers, method, body):
        assert url == "http://example.test"
        assert method == "GET"
        return {"status": 200, "body": "echo: " + body.upper()}

    p = JavascriptProcessor(code="""
(() => {
  let foo = bento.v0_fetch("http://example.test", {}, "GET",
                           bento.v0_msg_as_string());
  bento.v0_msg_set_string(foo.status.toString() + ": " + foo.body);
})();
""", fetch_fn=fake_fetch)
    out = run_proc(p, "first", "second")
    assert [m.content_bytes().decode() for m in out] == \
        ["200: echo: FIRST", "200: echo: SECOND"]


def test_processor_fetch_without_hook_throws_to_js():
    p = build_processor({"javascript": {"code": """
(() => {
  try { bento.v0_fetch("http://x", {}, "GET", ""); }
  catch (e) { bento.v0_msg_set_meta("err", e); }
})();
"""}})
    (m,) = run_proc(p, "x")
    assert "network disabled" in m.meta["err"]


def test_processor_requires_code_or_file():
    with pytest.raises(ValueError, match="code.*file|file.*code"):
        JavascriptProcessor()


def test_processor_state_isolated_between_messages():
    # each message runs in a fresh top-level scope, so top-level lets
    # do not collide across messages (goja wraps per-run programs)
    p = build_processor({"javascript": {"code": """
let tag = bento.v0_msg_as_string() + "!"
bento.v0_msg_set_string(tag)
"""}})
    out = run_proc(p, "a", "b")
    assert [m.content_bytes().decode() for m in out] == ["a!", "b!"]


def test_this_binding_new_and_methods():
    """`this` binds in constructors, object methods, and lexically in
    arrows (goja parity) — it used to always evaluate to undefined."""
    assert run_js("function Foo(){ this.x = 1 } var f = new Foo(); f.x") == 1
    assert run_js("var o = {name:'a', greet: function(){ return this.name }};"
                  " o.greet()") == "a"
    assert run_js("var o = {n: 5, f: function(){"
                  " var g = () => this.n * 2; return g() }}; o.f()") == 10
    assert run_js("var o = {v: 7, get: function(){ return this.v }};"
                  " o.get.call({v: 9})") == 9


def test_parse_int_hex_autodetect():
    assert run_js("parseInt('0x1F')") == 31
    assert run_js("parseInt('0X10')") == 16
    assert run_js("parseInt('10', 16)") == 16
    assert run_js("parseInt('10')") == 10
