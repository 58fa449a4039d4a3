"""Bloblang-equivalent scalar function library (SURVEY.md §2.8)."""

import pyarrow as pa
import pytest

from bento_ray.functions import FUNCTIONS, METHODS, apply_method, call


def col(vals, t=None):
    return pa.array(vals, t)


def test_string_methods():
    c = col(["Hello World", "  pad  ", None])
    assert METHODS["uppercase"](c).to_pylist() == ["HELLO WORLD", "  PAD  ", None]
    assert METHODS["lowercase"](c).to_pylist()[0] == "hello world"
    assert METHODS["trim"](c).to_pylist()[1] == "pad"
    assert METHODS["has_prefix"](c, "Hello").to_pylist() == [True, False, None]
    assert METHODS["contains"](c, "World").to_pylist()[0] is True
    assert METHODS["replace_all"](col(["a-b-c"]), "-", "_").to_pylist() == ["a_b_c"]
    assert METHODS["re_replace_all"](col(["a1b22c"]), r"\d+", "#").to_pylist() == ["a#b#c"]
    assert METHODS["slug"](col(["Hello, World!"])).to_pylist() == ["hello-world"]
    assert METHODS["split"](col(["a,b,c"]), ",").to_pylist() == [["a", "b", "c"]]
    assert METHODS["quote"](col(['say "hi"'])).to_pylist() == ['"say \\"hi\\""']


def test_strip_html_method_matches_reference_example():
    c = col(["<p>the plain <strong>old text</strong></p>"])
    assert METHODS["strip_html"](c).to_pylist() == ["the plain old text"]


def test_encode_decode_hash():
    c = col(["hello"])
    b64 = METHODS["encode"](c, "base64").to_pylist()[0]
    assert b64 == "aGVsbG8="
    assert METHODS["decode"](col([b64]), "base64").to_pylist()[0] == b"hello"
    hx = METHODS["encode"](c, "hex").to_pylist()[0]
    assert hx == "68656c6c6f"
    assert METHODS["hash"](c, "sha256").to_pylist()[0].startswith("2cf24dba")


def test_number_methods():
    c = col([1.5, -2.7, 4.0])
    assert METHODS["ceil"](c).to_pylist() == [2, -2, 4]
    assert METHODS["floor"](c).to_pylist() == [1, -3, 4]
    assert METHODS["abs"](c).to_pylist() == [1.5, 2.7, 4.0]
    assert METHODS["min"](c, 2.0).to_pylist() == [1.5, -2.7, 2.0]
    assert METHODS["int64"](col([3.0])).to_pylist() == [3]


def test_structured_methods():
    c = col([[3, 1, 2, 1]], pa.list_(pa.int64()))
    assert METHODS["sum"](c).to_pylist() == [7.0]
    assert METHODS["unique"](c).to_pylist() == [[1, 2, 3]]
    assert METHODS["sort"](c).to_pylist() == [[1, 1, 2, 3]]
    assert METHODS["flatten"](col([[[1], [2, 3]]],
                                  pa.list_(pa.list_(pa.int64())))).to_pylist() == [[1, 2, 3]]
    assert METHODS["length"](c).to_pylist() == [4]


def test_time_methods():
    ts = col(["2024-01-01 00:00:07"])
    parsed = METHODS["ts_strptime"](ts, "%Y-%m-%d %H:%M:%S")
    assert METHODS["ts_unix"](parsed).to_pylist() == [1704067200 + 7]
    rounded = METHODS["ts_round"](parsed, 10_000_000)
    assert METHODS["ts_unix"](rounded).to_pylist() == [1704067210]


def test_generators_deterministic_with_seed():
    a = call("uuid_v4", 3, seed=7).to_pylist()
    b = call("uuid_v4", 3, seed=7).to_pylist()
    assert a == b and len(set(a)) == 3
    r = call("random_int", 5, seed=1, lo=0, hi=10).to_pylist()
    assert r == call("random_int", 5, seed=1, lo=0, hi=10).to_pylist()
    assert call("range", 4, start=2, step=3).to_pylist() == [2, 5, 8, 11]


def test_apply_method_on_table():
    t = pa.table({"s": ["x", "y"]})
    out = apply_method(t, "s", "uppercase", out="S")
    assert out.column("S").to_pylist() == ["X", "Y"]
    out2 = apply_method(t, "s", "uppercase")
    assert out2.column("s").to_pylist() == ["X", "Y"]


def test_registry_coverage():
    # the registries cover the inventoried families
    for name in ["uppercase", "lowercase", "trim", "hash", "encode", "decode",
                 "re_match", "re_replace_all", "split", "join", "strip_html",
                 "parse_json", "format_json", "parse_url", "ceil", "floor",
                 "round", "abs", "log", "sqrt", "sum", "unique", "sort",
                 "flatten", "ts_parse", "ts_strftime", "ts_unix", "compress",
                 "decompress"]:
        assert name in METHODS, name
    for name in ["uuid_v4", "nanoid", "ksuid", "now", "random_int", "range",
                 "hostname", "env"]:
        assert name in FUNCTIONS, name


def test_interpolation():
    import pyarrow as pa

    from bento_ray.functions.bloblang import interpolate

    t = pa.table({"lang": ["en", "de"], "n": [1, 2]})
    assert interpolate(t, "k-${lang}:${n}!").to_pylist() == \
        ["k-en:1!", "k-de:2!"]
    assert interpolate(t, "${! lang }").to_pylist() == ["en", "de"]
    assert interpolate(t, "static").to_pylist() == ["static", "static"]
    with pytest.raises(KeyError):
        interpolate(t, "${missing}")


def test_xxhash64_spec_vectors():
    """Pure-Python XXH64 against the public spec test vectors and (when
    present) the system libxxhash."""
    from bento_ray.functions.xxh import xxhash64

    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    try:
        import ctypes

        lib = ctypes.CDLL("libxxhash.so.0")
        lib.XXH64.restype = ctypes.c_uint64
        lib.XXH64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.c_uint64]
        import random

        rng = random.Random(3)
        for ln in [0, 7, 31, 32, 33, 100, 1000]:
            data = bytes(rng.randrange(256) for _ in range(ln))
            assert xxhash64(data, 5) == lib.XXH64(data, ln, 5)
    except OSError:
        pass


def test_hash_xxhash64_reference_format():
    """hash("xxhash64") returns the DECIMAL string of the true digest
    (methods_strings.go:852-857 formats with strconv.FormatUint base
    10)."""
    import pyarrow as pa

    from bento_ray.functions.bloblang import METHODS
    from bento_ray.functions.xxh import xxhash64

    vals = ["hello world", "", "bento"]
    out = METHODS["hash"](pa.array(vals), "xxhash64").to_pylist()
    assert out == [str(xxhash64(v.encode())) for v in vals]


def test_hash_crc32_decimal():
    import binascii

    import pyarrow as pa

    from bento_ray.functions.bloblang import METHODS

    out = METHODS["hash"](pa.array(["hello"]), "crc32").to_pylist()
    assert out == [str(binascii.crc32(b"hello"))]


# ----------------------------------------------------------- fake()
def test_fake_all_documented_functions():
    """bloblang.go:62-67 documented list — every name returns a
    non-empty value; shapes spot-checked; unknown errors like
    GetFakeValue's tail (bloblang.go:240)."""
    import re

    from bento_ray.fakegen import get_fake_value

    documented = [
        "latitude", "longitude", "unix_time", "date", "time_string",
        "month_name", "year_string", "day_of_week", "day_of_month",
        "timestamp", "century", "timezone", "time_period", "email",
        "mac_address", "domain_name", "url", "username", "ipv4",
        "ipv6", "password", "jwt", "word", "sentence", "paragraph",
        "cc_type", "cc_number", "currency", "amount_with_currency",
        "title_male", "title_female", "first_name", "first_name_male",
        "first_name_female", "last_name", "name", "gender",
        "chinese_first_name", "chinese_last_name", "chinese_name",
        "phone_number", "toll_free_phone_number", "e164_phone_number",
        "uuid_hyphenated", "uuid_digit",
    ]
    for fn in documented:
        v = get_fake_value(fn)
        assert v not in (None, ""), fn
    assert isinstance(get_fake_value("latitude"), float)
    assert -90 <= get_fake_value("latitude") <= 90
    assert isinstance(get_fake_value("unix_time"), int)
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", get_fake_value("date"))
    assert re.fullmatch(r"\d{2}:\d{2}:\d{2}",
                        get_fake_value("time_string"))
    assert re.fullmatch(r"[a-z0-9]+@[a-z]+\.[a-z]+",
                        get_fake_value("email"))
    assert re.fullmatch(r"(\d{1,3}\.){3}\d{1,3}", get_fake_value("ipv4"))
    assert re.fullmatch(r"([0-9a-f]{4}:){7}[0-9a-f]{4}",
                        get_fake_value("ipv6"))
    assert get_fake_value("jwt").count(".") == 2
    assert re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}",
        get_fake_value("uuid_hyphenated"))
    assert re.fullmatch(r"[0-9a-f]{32}", get_fake_value("uuid_digit"))
    assert re.fullmatch(r"\d{3}-\d{3}-\d{4}",
                        get_fake_value("phone_number"))
    assert get_fake_value("") != ""  # default FakeData(&str)


def test_fake_in_mapping_and_invalid():
    from bento_ray.blobl import compile_mapping
    from bento_ray.blobl.interp import BloblangError, Message

    got = compile_mapping('root.e = fake("email")').run_value({})
    assert "@" in got["e"]
    with pytest.raises(BloblangError, match="invalid faker function: foo"):
        compile_mapping('root = fake("foo")').run_value({})


def test_ulid_encodings_and_sources():
    """lang/bloblang_test.go TestULID*: crockford = 26 chars (both
    random sources), hex = 32 chars, monotone-ish timestamp prefix."""
    import re

    from bento_ray.blobl import compile_mapping
    from bento_ray.blobl.interp import BloblangError

    run = lambda m: compile_mapping(m).run_value({})
    u = run("root = ulid()")
    assert len(u) == 26 and re.fullmatch(
        r"[0-9ABCDEFGHJKMNPQRSTVWXYZ]{26}", u)
    assert len(run('root = ulid("crockford", "fast_random")')) == 26
    h = run('root = ulid("hex")')
    assert len(h) == 32 and re.fullmatch(r"[0-9a-f]{32}", h)
    with pytest.raises(BloblangError):
        run('root = ulid("nope")')
    with pytest.raises(BloblangError):
        run('root = ulid("crockford", "nope")')


def test_snowflake_id_layout():
    """lang/bloblang.go snowflake spec: numeric string; node_id lands
    in bits 12..21."""
    from bento_ray.blobl import compile_mapping

    v = int(compile_mapping("root = snowflake_id(2)").run_value({}))
    assert (v >> 12) & 0x3FF == 2
    assert v > (1 << 22)
