"""Compression algorithm registry — the full census of the reference's
compress/decompress surface.

Reference: internal/impl/pure/algorithms.go (gzip, pgzip, zlib, flate,
bzip2, snappy, lz4) and internal/impl/pure/extended/zstd.go (zstd).
The reference registers each algorithm with a one-shot
CompressFunc/DecompressFunc pair (used by the `compress`/`decompress`
processors and the Bloblang methods) plus streaming
CompressWriter/DecompressReader pairs (used by the `decompress`
scanner); we mirror that split because snappy's two forms genuinely
differ: the one-shot pair is the raw *block* format
(`snappy.Encode`/`Decode`), the streaming pair is the *framed* stream
format (`snappy.NewReader`, chunked with masked CRC32C).

Heavy lifting is delegated to the compiled codecs bundled with
pyarrow (`pa.Codec` / `pa.CompressedInputStream`) — zstd, lz4-frame
and snappy-block are all spec-standard formats, so output is
interoperable with the Go reference byte-stream-wise (any conformant
decoder reads either side's output). Only the snappy *framing* layer
(chunk types, lengths, masked CRC32C — the format's
framing_format.txt) is implemented here, since Arrow exposes no
streaming snappy.

Why not pure Python: these codecs sit on the per-message processor
path; a Python LZ77 loop would be 100-1000x slower than the bundled
native kernels for zero semantic gain. pgzip (parallel gzip) is
byte-format-identical to gzip, so it aliases gzip here — the
parallelism lives in Ray's per-batch fan-out, not inside one call.
"""
from __future__ import annotations

import bz2
import gzip
import lzma
import zlib

import pyarrow as pa


class CompressionError(ValueError):
    pass


# ---------------------------------------------------------------- CRC32C

def _make_crc32c_table():
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _snappy_masked_crc(data: bytes) -> int:
    # framing_format.txt §3: mask = rotate-right-15 then add a constant
    c = crc32c(data)
    return ((((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ------------------------------------------------------- snappy (block)

def _uvarint(data: bytes, pos: int = 0) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(data):
            raise CompressionError("snappy: truncated length varint")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 63:
            raise CompressionError("snappy: length varint overflow")


def snappy_block_compress(data: bytes) -> bytes:
    return pa.Codec("snappy").compress(data, asbytes=True)


def snappy_block_decompress(data: bytes) -> bytes:
    size, _ = _uvarint(data)
    if size == 0:
        return b""
    try:
        return pa.Codec("snappy").decompress(
            data, decompressed_size=size, asbytes=True)
    except (pa.ArrowInvalid, OSError) as e:
        raise CompressionError(f"snappy: {e}") from e


# ------------------------------------------------------ snappy (framed)

_SNAPPY_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"
_SNAPPY_MAX_CHUNK = 65536


def snappy_framed_compress(data: bytes) -> bytes:
    out = [_SNAPPY_STREAM_ID]
    for off in range(0, len(data), _SNAPPY_MAX_CHUNK):
        chunk = data[off:off + _SNAPPY_MAX_CHUNK]
        crc = _snappy_masked_crc(chunk)
        comp = snappy_block_compress(chunk)
        # like the Go writer: fall back to an uncompressed chunk when
        # compression doesn't buy at least 1/8
        if len(comp) >= len(chunk) - len(chunk) // 8:
            body, ctype = chunk, 0x01
        else:
            body, ctype = comp, 0x00
        ln = len(body) + 4
        out.append(bytes((ctype, ln & 0xFF, (ln >> 8) & 0xFF,
                          (ln >> 16) & 0xFF)))
        out.append(crc.to_bytes(4, "little"))
        out.append(body)
    return b"".join(out)


def snappy_framed_decompress(data: bytes) -> bytes:
    if not data.startswith(_SNAPPY_STREAM_ID):
        raise CompressionError("snappy: missing stream identifier")
    pos, out = len(_SNAPPY_STREAM_ID), []
    while pos < len(data):
        if pos + 4 > len(data):
            raise CompressionError("snappy: truncated chunk header")
        ctype = data[pos]
        ln = int.from_bytes(data[pos + 1:pos + 4], "little")
        pos += 4
        if pos + ln > len(data):
            raise CompressionError("snappy: truncated chunk body")
        body = data[pos:pos + ln]
        pos += ln
        if ctype == 0xFF:  # stream identifier (may repeat)
            if body != _SNAPPY_STREAM_ID[4:]:
                raise CompressionError("snappy: bad stream identifier")
        elif ctype in (0x00, 0x01):  # compressed / uncompressed data
            if ln < 4:
                raise CompressionError("snappy: chunk too short for CRC")
            want_crc = int.from_bytes(body[:4], "little")
            payload = body[4:]
            raw = (snappy_block_decompress(payload) if ctype == 0x00
                   else payload)
            if _snappy_masked_crc(raw) != want_crc:
                raise CompressionError("snappy: chunk CRC mismatch")
            out.append(raw)
        elif 0x02 <= ctype <= 0x7F:  # reserved unskippable
            raise CompressionError(
                f"snappy: reserved unskippable chunk 0x{ctype:02x}")
        # 0x80-0xFE: reserved skippable / padding — ignore body
    return b"".join(out)


# ---------------------------------------------------- arrow-backed one-shots

def _arrow_compress(name: str, data: bytes, level: int | None) -> bytes:
    if level is not None and pa.Codec.supports_compression_level(name):
        lo = pa.Codec.minimum_compression_level(name)
        hi = pa.Codec.maximum_compression_level(name)
        codec = pa.Codec(name, compression_level=max(lo, min(hi, level)))
    else:
        codec = pa.Codec(name)
    return codec.compress(data, asbytes=True)


def _arrow_stream_decompress(name: str, data: bytes) -> bytes:
    # CompressedInputStream needs no decompressed_size and accepts both
    # streamed and one-shot frames (verified for zstd/lz4/gzip)
    try:
        return pa.CompressedInputStream(pa.BufferReader(data), name).read()
    except pa.ArrowInvalid as e:  # corrupt frame
        raise CompressionError(str(e)) from e
    except OSError as e:
        raise CompressionError(str(e)) from e


# --------------------------------------------------------------- registry

def _gzip_compress(data: bytes, level: int) -> bytes:
    return gzip.compress(data, compresslevel=9 if level < 0 else level)


def _zlib_compress(data: bytes, level: int, wbits: int = 15) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, wbits)
    return co.compress(data) + co.flush()


# name -> (compress(data, level) -> bytes, decompress(data) -> bytes)
_ONE_SHOT = {
    "gzip": (_gzip_compress, gzip.decompress),
    # pgzip output is format-identical gzip; parallelism comes from the
    # Ray batch fan-out, not inside one call (algorithms.go:180)
    "pgzip": (_gzip_compress, gzip.decompress),
    "zlib": (lambda d, lv: _zlib_compress(d, lv), zlib.decompress),
    "flate": (lambda d, lv: _zlib_compress(d, lv, wbits=-15),
              lambda d: zlib.decompress(d, wbits=-15)),
    "bzip2": (lambda d, lv: bz2.compress(d, 9 if lv < 1 else min(lv, 9)),
              bz2.decompress),
    # extras beyond the reference census, kept for the scanner surface
    "lzma": (lambda d, lv: lzma.compress(d), lzma.decompress),
    "xz": (lambda d, lv: lzma.compress(d), lzma.decompress),
    "snappy": (lambda d, lv: snappy_block_compress(d),
               snappy_block_decompress),
    # lz4 frame format, like the reference's pierrec/lz4 writer
    "lz4": (lambda d, lv: _arrow_compress("lz4", d, lv if lv > 0 else None),
            lambda d: _arrow_stream_decompress("lz4", d)),
    "zstd": (lambda d, lv: _arrow_compress("zstd", d,
                                           lv if lv != -1 else None),
             lambda d: _arrow_stream_decompress("zstd", d)),
}


def algorithms() -> list[str]:
    return sorted(_ONE_SHOT)


def compress(data: bytes, algorithm: str, level: int = -1) -> bytes:
    """One-shot compress — processor_compress.go / CompressFunc path."""
    try:
        fn = _ONE_SHOT[algorithm][0]
    except KeyError:
        raise CompressionError(
            f"compression type not recognised: {algorithm}") from None
    try:
        return fn(data, level)
    except Exception as e:  # wrap codec errors like decompress() does
        raise CompressionError(
            f"failed to compress {algorithm}: {e}") from e


def decompress(data: bytes, algorithm: str) -> bytes:
    """One-shot decompress — processor_decompress.go / DecompressFunc.
    Note snappy here is the raw BLOCK format (snappy.Decode), matching
    algorithms.go:291; the framed stream format is `stream_decompress`.
    """
    try:
        fn = _ONE_SHOT[algorithm][1]
    except KeyError:
        raise CompressionError(
            f"compression type not recognised: {algorithm}") from None
    try:
        return fn(data)
    except CompressionError:
        raise
    except Exception as e:  # zlib.error, OSError from gzip, lzma err...
        raise CompressionError(f"{algorithm}: {e}") from e


def stream_decompress(data: bytes, algorithm: str) -> bytes:
    """Streaming-reader semantics — scanner_decompress.go uses the
    registry's DecompressReader, which for snappy is the FRAMED format
    (snappy.NewReader, algorithms.go:294)."""
    if algorithm == "snappy":
        return snappy_framed_decompress(data)
    return decompress(data, algorithm)


def stream_compress(data: bytes, algorithm: str, level: int = -1) -> bytes:
    """Streaming-writer semantics (CompressWriter): snappy becomes the
    framed format (snappy.NewBufferedWriter, algorithms.go:287)."""
    if algorithm == "snappy":
        return snappy_framed_compress(data)
    return compress(data, algorithm, level)
