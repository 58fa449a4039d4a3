"""Compression registry census — algorithms.go + extended/zstd.go.

Cross-validation strategy: zstd / lz4-frame / snappy-block go through
pyarrow's bundled native codecs (the same spec formats the reference's
Go libs emit), so the round-trip here exercises real frames; the
snappy FRAMING layer (chunking + masked CRC32C) is ours and is pinned
against hand-derived spec vectors.
"""
import os

import pytest

from bento_ray import compression as cz

ALGS = ["gzip", "pgzip", "zlib", "flate", "bzip2", "lzma", "xz",
        "snappy", "lz4", "zstd"]

PAYLOADS = [
    b"",
    b"a",
    b"hello world",
    b"ab" * 40000,                       # highly compressible, >64 KiB
    os.urandom(5000),                    # incompressible
    bytes(range(256)) * 300,
    "πλήθος ユニコード ✓".encode(),
]


@pytest.mark.parametrize("alg", ALGS)
@pytest.mark.parametrize("i", range(len(PAYLOADS)))
def test_roundtrip_one_shot(alg, i):
    data = PAYLOADS[i]
    comp = cz.compress(data, alg)
    assert cz.decompress(comp, alg) == data


@pytest.mark.parametrize("alg", ALGS)
def test_roundtrip_stream(alg):
    data = b"stream me " * 20000
    comp = cz.stream_compress(data, alg)
    assert cz.stream_decompress(comp, alg) == data


def test_pgzip_is_gzip_compatible():
    import gzip
    data = b"pgzip output is plain gzip format" * 100
    assert gzip.decompress(cz.compress(data, "pgzip")) == data
    assert cz.decompress(gzip.compress(data), "pgzip") == data


def test_magic_bytes():
    # the formats are the standard on-the-wire ones, not private framings
    assert cz.compress(b"x" * 100, "zstd")[:4] == b"\x28\xb5\x2f\xfd"
    assert cz.compress(b"x" * 100, "lz4")[:4] == b"\x04\x22\x4d\x18"
    assert cz.compress(b"x" * 100, "gzip")[:2] == b"\x1f\x8b"
    assert cz.compress(b"x" * 100, "bzip2")[:3] == b"BZh"


def test_snappy_block_known_vectors():
    # block format spec: uncompressed-length varint, then a literal tag
    # ((len-1)<<2) for short inputs
    assert cz.compress(b"", "snappy") == b"\x00"
    assert cz.compress(b"abc", "snappy") == b"\x03\x08abc"
    assert cz.decompress(b"\x03\x08abc", "snappy") == b"abc"


def test_snappy_one_shot_is_block_stream_is_framed():
    data = b"two formats, like snappy.Encode vs snappy.NewBufferedWriter"
    block = cz.compress(data, "snappy")
    framed = cz.stream_compress(data, "snappy")
    assert not block.startswith(b"\xff\x06\x00\x00sNaPpY")
    assert framed.startswith(b"\xff\x06\x00\x00sNaPpY")
    assert cz.decompress(block, "snappy") == data
    assert cz.stream_decompress(framed, "snappy") == data


def test_snappy_framed_multi_chunk():
    data = b"z" * (65536 * 2 + 123)  # 3 chunks
    framed = cz.stream_compress(data, "snappy")
    assert cz.stream_decompress(framed, "snappy") == data


def test_snappy_framed_uncompressed_chunk_fallback():
    # incompressible payload must be stored as an uncompressed chunk
    data = os.urandom(1000)
    framed = cz.stream_compress(data, "snappy")
    assert framed[10] == 0x01  # first data chunk type after stream id
    assert cz.stream_decompress(framed, "snappy") == data


def test_snappy_framed_crc_detects_corruption():
    framed = bytearray(cz.stream_compress(b"check me" * 100, "snappy"))
    framed[-1] ^= 0xFF
    with pytest.raises(cz.CompressionError):
        cz.stream_decompress(bytes(framed), "snappy")


def test_snappy_framed_skippable_and_bad_chunks():
    data = b"payload"
    framed = bytearray(cz.stream_compress(data, "snappy"))
    # insert a padding chunk (type 0xfe) after the stream id — must skip
    pad = b"\xfe\x03\x00\x00xyz"
    framed[10:10] = pad
    assert cz.stream_decompress(bytes(framed), "snappy") == data
    # reserved unskippable chunk — must raise
    framed[10] = 0x02
    with pytest.raises(cz.CompressionError):
        cz.stream_decompress(bytes(framed), "snappy")


def test_crc32c_known_vectors():
    # RFC 3720 B.4 test vectors (iSCSI CRC32C)
    assert cz.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert cz.crc32c(b"\xff" * 32) == 0x62A8AB43
    assert cz.crc32c(bytes(range(32))) == 0x46DD794E
    assert cz.crc32c(b"123456789") == 0xE3069283


def test_zstd_level_changes_output_size():
    data = (b"abcdefgh" * 2000) + os.urandom(200) * 10
    fast = cz.compress(data, "zstd", level=1)
    slow = cz.compress(data, "zstd", level=19)
    assert cz.decompress(fast, "zstd") == data
    assert cz.decompress(slow, "zstd") == data
    assert len(slow) <= len(fast)


def test_zstd_decodes_streamed_frames_without_content_size():
    import pyarrow as pa
    data = b"no content size header here" * 1000
    sink = pa.BufferOutputStream()
    w = pa.CompressedOutputStream(sink, "zstd")
    w.write(data)
    w.close()
    assert cz.decompress(sink.getvalue().to_pybytes(), "zstd") == data


def test_unknown_algorithm():
    with pytest.raises(cz.CompressionError, match="not recognised"):
        cz.compress(b"x", "rot13")
    with pytest.raises(cz.CompressionError, match="not recognised"):
        cz.decompress(b"x", "rot13")


def test_corrupt_input_raises_compression_error():
    for alg in ("zstd", "lz4", "gzip", "zlib", "snappy"):
        with pytest.raises(cz.CompressionError):
            cz.decompress(b"\x01\x02\x03\x04garbage", alg)


def test_bloblang_methods_full_census():
    from bento_ray.blobl.methods import m_compress, m_decompress

    data = b"via bloblang compress(algorithm: ...)"
    for alg in ALGS:
        assert m_decompress(m_compress(data, alg), alg) == data


def test_bloblang_zstd_matches_reference_test_shape():
    # extended/zstd_test.go: compress != input, len > 1, decompress
    # round-trips
    from bento_ray.blobl.methods import m_compress, m_decompress

    data = b"hello world this is a test of zstd compression"
    comp = m_compress(data, "zstd")
    assert comp != data and len(comp) > 1
    assert m_decompress(comp, "zstd") == data


def test_scanner_decompress_new_codecs():
    from bento_ray.sources import scanners

    payload = b"line one\nline two\nline three"
    for alg in ("zstd", "lz4", "snappy", "pgzip"):
        comp = cz.stream_compress(payload, alg)
        scan = scanners.decompress(alg, inner=scanners.lines())
        assert list(scan(comp)) == payload.split(b"\n")


def test_compress_processor_census():
    from bento_ray.blobl.interp import Message
    from bento_ray.config.processors import (CompressProcessor,
                                             DecompressProcessor)

    for alg in ("zstd", "lz4", "snappy"):
        batch = [Message.from_content(b"processor payload " * 10)]
        CompressProcessor(algorithm=alg).process_batch(batch, None)
        assert batch[0].content_bytes() != b"processor payload " * 10
        DecompressProcessor(algorithm=alg).process_batch(batch, None)
        assert batch[0].content_bytes() == b"processor payload " * 10
        assert not batch[0].error


def test_compress_wraps_codec_errors():
    from bento_ray.compression import CompressionError, compress

    with pytest.raises(CompressionError):
        compress(b"x", "gzip", 99)
