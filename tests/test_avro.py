"""Avro serde parity (internal/impl/avro/) and the xml_documents
scanner (internal/impl/pure/scanner_xml.go) — reference test vectors
transcribed from processor_test.go and scanner_xml_test.go."""

from __future__ import annotations

import json

import pytest

from bento_ray import avroschema as av
from bento_ray.blobl.interp import Message
from bento_ray.config.processors import Runtime, build_processor

# processor_test.go:54-70 — the identity/address schema.
IDENTITY_SCHEMA = """
{
  "namespace": "foo.namespace.com",
  "type": "record",
  "name": "identity",
  "fields": [
    { "name": "Name", "type": "string"},
    { "name": "Address", "type": [ "null", {
      "namespace": "my.namespace.com",
      "type": "record",
      "name": "address",
      "fields": [
        { "name": "City", "type": "string" },
        { "name": "State", "type": "string" }
      ]
    } ], "default": null }
  ]
}
"""

AVRO_JSON = (b'{"Name":"foo","Address":{"my.namespace.com.address":'
             b'{"City":"foo","State":"bar"}}}')
GO_SORTED_JSON = ('{"Address":{"my.namespace.com.address":'
                  '{"City":"foo","State":"bar"}},"Name":"foo"}')
BINARY = b"\x06foo\x02\x06foo\x06bar"


def run_avro(cfg: dict, content: bytes) -> Message:
    p = build_processor({"avro": cfg})
    out = p.process_batch([Message.from_content(content)], Runtime())
    return out[0][0]


# ------------------------------------------------ processor_test.go:24-46
@pytest.mark.parametrize("operator,encoding,inp,want", [
    ("to_json", "textual", AVRO_JSON, GO_SORTED_JSON),
    ("to_json", "binary", BINARY, GO_SORTED_JSON),
    ("from_json", "binary", AVRO_JSON, BINARY),
])
def test_avro_basic_reference_vectors(operator, encoding, inp, want):
    m = run_avro({"operator": operator, "encoding": encoding,
                  "schema": IDENTITY_SCHEMA}, inp)
    assert m.error is None
    got = m.content_bytes()
    assert got == (want if isinstance(want, bytes) else want.encode())


def test_avro_textual_round_trip():
    m = run_avro({"operator": "from_json", "encoding": "textual",
                  "schema": IDENTITY_SCHEMA}, AVRO_JSON)
    assert m.error is None
    back = run_avro({"operator": "to_json", "encoding": "textual",
                     "schema": IDENTITY_SCHEMA}, m.content_bytes())
    assert json.loads(back.content_bytes()) == json.loads(AVRO_JSON)


def test_avro_schema_path(tmp_path):
    """processor_test.go:89-170: file:// schema_path."""
    f = tmp_path / "identity.avsc"
    f.write_text(IDENTITY_SCHEMA)
    m = run_avro({"operator": "to_json", "encoding": "binary",
                  "schema_path": f"file://{f}"}, BINARY)
    assert m.error is None
    assert m.content_bytes() == GO_SORTED_JSON.encode()


def test_avro_schema_path_not_exist():
    """processor_test.go:173-183."""
    with pytest.raises(ValueError, match="failed to load"):
        build_processor({"avro": {
            "operator": "to_json",
            "schema_path": "file://path_does_not_exist"}})


def test_avro_bad_operator_and_missing_schema():
    with pytest.raises(ValueError, match="operator not recognised"):
        build_processor({"avro": {"operator": "nope", "schema": "{}"}})
    with pytest.raises(ValueError, match="schema must be specified"):
        build_processor({"avro": {"operator": "to_json"}})


def test_avro_decode_error_sets_message_error():
    m = run_avro({"operator": "to_json", "encoding": "binary",
                  "schema": IDENTITY_SCHEMA}, b"\xff\xff\xff\xff\xff\xff")
    assert m.error is not None


# --------------------------------------------------- single-object + OCF
def test_avro_single_object_encoding():
    """Avro spec single-object encoding: C3 01 marker + little-endian
    CRC-64-AVRO fingerprint of the canonical schema + binary body."""
    s = av.parse_schema(IDENTITY_SCHEMA)
    native = av._from_avro_json(s, json.loads(AVRO_JSON))
    blob = av.encode_single(s, native)
    assert blob[:2] == b"\xc3\x01"
    assert blob[10:] == BINARY
    assert av.decode_single(s, blob) == av.decode_binary(s, BINARY)
    # wrong fingerprint rejected
    bad = blob[:2] + b"\x00" * 8 + blob[10:]
    with pytest.raises(av.AvroError):
        av.decode_single(s, bad)


def test_avro_canonical_fingerprint_known_vector():
    """CRC-64-AVRO of the canonical form of '"int"' is a published
    spec vector: 0x7275d51a3f395c8f."""
    s = av.parse_schema('"int"')
    assert av.canonical_form(s) == '"int"'
    fp = int.from_bytes(av.schema_fingerprint(s), "little")
    assert fp == 0x7275D51A3F395C8F


def test_avro_ocf_round_trip_and_scanner():
    s = av.parse_schema(IDENTITY_SCHEMA)
    vals = [
        {"Name": "a", "Address": {"my.namespace.com.address":
                                  {"City": "x", "State": "y"}}},
        {"Name": "b", "Address": None},
    ]
    ocf = av.write_ocf(s, IDENTITY_SCHEMA, vals)
    from bento_ray.sources.scanners import avro as avro_scanner
    got = [x.decode() for x in avro_scanner()(ocf)]
    assert got == [
        '{"Name":"a","Address":{"my.namespace.com.address":'
        '{"City":"x","State":"y"}}}',
        '{"Name":"b","Address":null}',
    ]
    raw = [json.loads(x) for x in avro_scanner(raw_json=True)(ocf)]
    assert raw == [
        {"Name": "a", "Address": {"City": "x", "State": "y"}},
        {"Name": "b", "Address": None},
    ]


def test_avro_ocf_deflate_codec():
    s = av.parse_schema('"string"')
    vals = ["hello", "world", "x" * 1000]
    ocf = av.write_ocf(s, '"string"', vals, codec="deflate")
    r = av.read_ocf(ocf)
    assert list(r.values()) == vals


# ------------------------------------------------- full-type round trips
FULL_SCHEMA = """
{
  "type": "record", "name": "All", "fields": [
    {"name": "b", "type": "boolean"},
    {"name": "i", "type": "int"},
    {"name": "l", "type": "long"},
    {"name": "f", "type": "float"},
    {"name": "d", "type": "double"},
    {"name": "s", "type": "string"},
    {"name": "by", "type": "bytes"},
    {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}},
    {"name": "e", "type": {"type": "enum", "name": "E",
                           "symbols": ["A", "B", "C"]}},
    {"name": "arr", "type": {"type": "array", "items": "int"}},
    {"name": "m", "type": {"type": "map", "values": "string"}},
    {"name": "u", "type": ["null", "int", "string"]}
  ]
}
"""


@pytest.mark.parametrize("u", [None, {"int": 7}, {"string": "s"}])
def test_avro_all_types_binary_round_trip(u):
    s = av.parse_schema(FULL_SCHEMA)
    native = {"b": True, "i": -3, "l": 2**40, "f": 1.5, "d": -2.25,
              "s": "héllo", "by": b"\x00\x01\xff", "fx": b"abcd",
              "e": "B", "arr": [1, -2, 3], "m": {"k": "v", "q": "w"},
              "u": u}
    blob = av.encode_binary(s, native)
    back = av.decode_binary(s, blob)
    assert back == native
    # textual round trip through Avro-JSON
    txt = av.encode_textual(s, native)
    assert av.decode_textual(s, txt) == native


def test_avro_zigzag_known_vectors():
    """Avro spec varint/zigzag examples: 0→00, -1→01, 1→02, -64→7f,
    64→80 01."""
    import io
    for v, enc in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                   (-64, b"\x7f"), (64, b"\x80\x01")]:
        out = io.BytesIO()
        av._write_long(out, v)
        assert out.getvalue() == enc
        assert av._read_long(io.BytesIO(enc)) == v


def test_avro_default_applied_on_missing_field():
    s = av.parse_schema("""
    {"type": "record", "name": "R", "fields": [
      {"name": "a", "type": "string"},
      {"name": "n", "type": "int", "default": 42}
    ]}""")
    native = av._from_avro_json(s, {"a": "x"})
    assert native == {"a": "x", "n": 42}


# ---------------------------------------------- xml_documents scanner
def xml_scan(data: bytes, cast: bool = False):
    from bento_ray.sources.scanners import xml_documents
    return [x.decode() for x in xml_documents(cast=cast)(data)]


def test_xml_documents_default():
    """scanner_xml_test.go TestXMLScannerDefault."""
    data = b"<a>a0</a>\n<a>a1</a>\n<a>a2</a>\n<a>a3</a>\n<a>a4</a>\n"
    assert xml_scan(data) == [f'{{"a":"a{i}"}}' for i in range(5)]


def test_xml_documents_bad_data_between_docs():
    """TestXMLScannerBadData: garbage between documents is skipped."""
    assert xml_scan(b"<a>a0</a>invalid\n<a>a1</a>\n") == [
        '{"a":"a0"}', '{"a":"a1"}']


def test_xml_documents_formatted():
    """TestXMLScannerFormatted: whitespace around text trimmed."""
    data = b"<a>\n\t\ta0\n\t</a>\n<a>\n\ta1\n</a>\n"
    assert xml_scan(data) == ['{"a":"a0"}', '{"a":"a1"}']


def test_xml_documents_nested():
    """TestXMLScannerNested."""
    data = b"<a><b>ab0</b></a>\n<a><b>ab1</b></a>\n"
    assert xml_scan(data) == ['{"a":{"b":"ab0"}}', '{"a":{"b":"ab1"}}']


def test_xml_documents_cast_and_prelude():
    data = (b'<?xml version="1.0"?>\n<!-- c -->\n'
            b'<r n="3">true</r>\n<r n="x">7</r>')
    assert xml_scan(data, cast=True) == [
        '{"r":{"#text":true,"-n":3}}', '{"r":{"#text":7,"-n":"x"}}']


def test_file_input_scanner_field_yaml(tmp_path, ray_session):
    """input_file.go scanner field through the YAML surface: an Avro
    OCF file exploded by the avro scanner, and an xml_documents file,
    each via Pipeline.from_yaml."""
    s = av.parse_schema('"string"')
    (tmp_path / "vals.avro").write_bytes(
        av.write_ocf(s, '"string"', ["a", "b", "c"]))
    (tmp_path / "docs.xml").write_text("<d>x</d>\n<d>y</d>\n")

    from bento_ray.pipelines.builder import Pipeline

    rows = Pipeline.from_yaml(f"""
input:
  file:
    paths: ["{tmp_path}/vals.avro"]
    scanner:
      avro: {{}}
""").dataset().take_all()
    assert sorted(r["content"] for r in rows) == [b'"a"', b'"b"', b'"c"']

    rows = Pipeline.from_yaml(f"""
input:
  file:
    paths: ["{tmp_path}/docs.xml"]
    scanner:
      xml_documents:
        operator: to_json
""").dataset().take_all()
    assert sorted(r["content"] for r in rows) == [
        b'{"d":"x"}', b'{"d":"y"}']


def test_build_scanner_nested_decompress():
    import gzip

    from bento_ray.sources.scanners import build_scanner

    sc = build_scanner({"decompress": {"algorithm": "gzip",
                                       "into": {"lines": {}}}})
    data = gzip.compress(b"one\ntwo\nthree")
    assert list(sc(data)) == [b"one", b"two", b"three"]
    with pytest.raises(ValueError, match="unknown scanner"):
        build_scanner({"nope": {}})


def test_ocf_snappy_roundtrip():
    """Avro spec: snappy OCF blocks are the raw snappy block format
    followed by a 4-byte big-endian CRC32 of the uncompressed bytes."""
    from bento_ray.avroschema import parse_schema, read_ocf, write_ocf

    sj = '{"type":"record","name":"R","fields":[{"name":"a","type":"long"},{"name":"s","type":"string"}]}'
    schema = parse_schema(sj)
    vals = [{"a": i, "s": f"row {i}"} for i in range(50)]
    blob = write_ocf(schema, sj, vals, codec="snappy")
    it = read_ocf(blob)
    assert it.codec == "snappy"
    assert list(it.values()) == vals


def test_ocf_snappy_crc_mismatch_detected():
    import pytest

    from bento_ray.avroschema import (AvroError, parse_schema, read_ocf,
                                      write_ocf)

    sj = '{"type":"record","name":"R","fields":[{"name":"a","type":"long"}]}'
    schema = parse_schema(sj)
    blob = bytearray(write_ocf(schema, sj, [{"a": 1}], codec="snappy"))
    blob[-18] ^= 0xFF  # flip a CRC byte (4-byte CRC sits before 16-byte sync, first byte of CRC may align differently; flip inside CRC region)
    with pytest.raises(AvroError):
        list(read_ocf(bytes(blob)).values())


def test_bytes_string_uses_iso8859_convention():
    """A str value for a 'bytes' schema uses the Avro-JSON ISO-8859-1
    one-char-per-byte convention (like 'fixed' and decode_textual) —
    utf-8 doubled every byte over 0x7F."""
    import json

    from bento_ray.avroschema import encode_binary, parse_schema

    sch = parse_schema(json.dumps({
        "type": "record", "name": "R",
        "fields": [{"name": "b", "type": "bytes"}]}))
    out = encode_binary(sch, {"b": "é"})
    assert out == b"\x02\xe9"  # 1 byte 0xE9, not utf-8 c3 a9
