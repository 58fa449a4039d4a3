"""``command`` / ``subprocess`` processors — reference semantics from
internal/impl/io/processor_command.go and processor_subprocess.go
(test shapes from their _test.go files, using sandbox-available
binaries: cat, tr, sed, sh)."""
import json
import sys

from bento_ray.blobl.interp import Message
from bento_ray.config.processors import (CommandProcessor, Runtime,
                                         SubprocessProcessor,
                                         build_processor)


def _rt():
    return Runtime()


def _msgs(*contents):
    return [Message.from_content(c) for c in contents]


# ------------------------------------------------------------- command

def test_command_static_no_args():
    batch = _msgs(b"hello world")
    CommandProcessor(name="cat").process_batch(batch, _rt())
    assert batch[0].content_bytes() == b"hello world"
    assert not batch[0].error


def test_command_static_with_args():
    batch = _msgs(b"hello")
    CommandProcessor(name="tr",
                     args_mapping='[ "a-z", "A-Z" ]') \
        .process_batch(batch, _rt())
    assert batch[0].content_bytes() == b"HELLO"


def test_command_dynamic_name_and_args():
    # processor_command_test.go "dynamic args": the argv comes from
    # the message itself
    batch = _msgs(json.dumps(
        {"name": "sed", "args": ["s/foo/bar/"]}))
    p = build_processor({"command": {"name": "${! this.name }",
                                     "args_mapping": "this.args"}})
    batch[0].raw = json.dumps(
        {"name": "sed", "args": ["s/foo/bar/"]}).encode()
    # stdin is the raw message bytes (the JSON itself here)
    p.process_batch(batch, _rt())
    assert b"bar" in batch[0].content_bytes()
    assert not batch[0].error


def test_command_nonzero_exit_sets_error_content_unchanged():
    batch = _msgs(b"payload")
    CommandProcessor(name="sh",
                     args_mapping='[ "-c", "echo oops >&2; exit 3" ]') \
        .process_batch(batch, _rt())
    assert batch[0].error and "oops" in batch[0].error
    assert batch[0].content_bytes() == b"payload"  # unchanged


def test_command_stderr_on_success_goes_to_metadata():
    batch = _msgs(b"x")
    CommandProcessor(
        name="sh",
        args_mapping='[ "-c", "echo warn >&2; echo out" ]') \
        .process_batch(batch, _rt())
    assert batch[0].content_bytes().strip() == b"out"
    assert batch[0].meta.get("command_stderr", "").strip() == "warn"


def test_command_missing_binary_sets_error():
    batch = _msgs(b"x")
    CommandProcessor(name="definitely-not-a-binary-xyz") \
        .process_batch(batch, _rt())
    assert "execution error" in batch[0].error


def test_command_args_mapping_non_array_error():
    batch = _msgs(b"x")
    CommandProcessor(name="cat", args_mapping='"notanarray"') \
        .process_batch(batch, _rt())
    assert "args mapping" in batch[0].error


# ---------------------------------------------------------- subprocess

def test_subprocess_lines_roundtrip_and_reuse():
    p = SubprocessProcessor(name="sed", args=["-u", "s/$/ ok/"])
    b1 = _msgs(b"first")
    p.process_batch(b1, _rt())
    assert b1[0].content_bytes() == b"first ok"
    pid = p.handle.proc.pid
    b2 = _msgs(b"second")
    p.process_batch(b2, _rt())
    assert b2[0].content_bytes() == b"second ok"
    assert p.handle.proc.pid == pid  # same long-lived child
    p.handle.stop()


def test_subprocess_multiline_message_joins_per_line_results():
    # processor_subprocess.go lines codec: each line fed separately,
    # responses joined with newlines
    p = SubprocessProcessor(name="sed", args=["-u", "s/^/> /"])
    batch = _msgs(b"a\nb\nc")
    p.process_batch(batch, _rt())
    assert batch[0].content_bytes() == b"> a\n> b\n> c"
    p.handle.stop()


def test_subprocess_restarts_after_child_exit():
    p = SubprocessProcessor(name="sed", args=["-u", "s/x/y/"])
    batch = _msgs(b"x1")
    p.process_batch(batch, _rt())
    assert batch[0].content_bytes() == b"y1"
    p.handle.proc.kill()
    p.handle.proc.wait()
    batch2 = _msgs(b"x2")
    p.process_batch(batch2, _rt())
    assert batch2[0].content_bytes() == b"y2"
    p.handle.stop()


def test_subprocess_length_prefixed_codec():
    # a python echo child speaking length_prefixed_uint32_be both ways
    child = (
        "import struct,sys\n"
        "while True:\n"
        "    h=sys.stdin.buffer.read(4)\n"
        "    if len(h)<4: break\n"
        "    n=struct.unpack('>I',h)[0]\n"
        "    d=sys.stdin.buffer.read(n)\n"
        "    out=d.upper()\n"
        "    sys.stdout.buffer.write(struct.pack('>I',len(out))+out)\n"
        "    sys.stdout.buffer.flush()\n")
    p = SubprocessProcessor(name=sys.executable, args=["-c", child],
                            codec_send="length_prefixed_uint32_be",
                            codec_recv="length_prefixed_uint32_be")
    batch = _msgs(b"binary \n payload \x00!")
    p.process_batch(batch, _rt())
    assert batch[0].content_bytes() == b"BINARY \n PAYLOAD \x00!"
    p.handle.stop()


def test_subprocess_netstring_codec():
    child = (
        "import sys\n"
        "buf=sys.stdin.buffer\n"
        "while True:\n"
        "    d=b''\n"
        "    c=buf.read(1)\n"
        "    if not c: break\n"
        "    while c!=b':':\n"
        "        d+=c\n"
        "        c=buf.read(1)\n"
        "    n=int(d)\n"
        "    body=buf.read(n); buf.read(1)\n"
        "    out=body[::-1]\n"
        "    sys.stdout.buffer.write(str(len(out)).encode()+b':'+out+b',')\n"
        "    sys.stdout.buffer.flush()\n")
    p = SubprocessProcessor(name=sys.executable, args=["-c", child],
                            codec_send="netstring",
                            codec_recv="netstring")
    batch = _msgs(b"abcdef")
    p.process_batch(batch, _rt())
    assert batch[0].content_bytes() == b"fedcba"
    p.handle.stop()


def test_subprocess_bad_codec_rejected():
    import pytest

    with pytest.raises(ValueError, match="codec_send"):
        SubprocessProcessor(name="cat", codec_send="nope")
    with pytest.raises(ValueError, match="codec_recv"):
        SubprocessProcessor(name="cat", codec_recv="nope")


def test_config_registry_dispatch():
    p = build_processor({"subprocess": {"name": "sed",
                                        "args": ["-u", "s/a/b/"]}})
    batch = _msgs(b"aaa")
    p.process_batch(batch, _rt())
    assert batch[0].content_bytes() == b"baa"
    p.handle.stop()
