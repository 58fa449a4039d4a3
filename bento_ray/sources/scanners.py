"""Scanners — byte-stream → message segmentation codecs.

Reference: internal/impl/pure/scanner_*.go. Each scanner maps one raw
byte payload to an ordered list of messages; ``scan_paths`` lifts a
scanner over files distributed (one flat_map task per file — the
reference applies scanners per input stream the same way).

Composable like the reference's nested scanner configs:
``decompress(gzip, tar)`` etc.
"""

from __future__ import annotations

import io
import re
from typing import Callable, Iterator

Scanner = Callable[[bytes], Iterator[bytes]]


def chunker(size: int) -> Scanner:
    """scanner_chunker.go: fixed-size byte chunks (last may be short)."""

    def scan(data: bytes):
        for i in range(0, len(data), size):
            yield data[i:i + size]

    return scan


def lines(custom_delimiter: str | bytes | None = None,
          omit_empty: bool = False) -> Scanner:
    """scanner_lines.go: newline-delimited. A trailing delimiter is a
    terminator (no phantom final record); interior empty lines are
    REAL records unless ``omit_empty`` (bufio.Scanner emits them).
    With the default newline delimiter a trailing ``\\r`` is stripped
    from each record (bufio.ScanLines dropCR — CRLF files yield the
    same records as LF files). ``custom_delimiter`` switches to a
    plain split on that byte sequence, exactly like the reference's
    bufio.SplitFunc override."""
    delim = (custom_delimiter.encode()
             if isinstance(custom_delimiter, str) else custom_delimiter)

    def scan(data: bytes):
        d = delim or b"\n"
        if data.endswith(d):
            data = data[:-len(d)]
        elif not data:
            return
        for ln in data.split(d):
            if delim is None and ln.endswith(b"\r"):
                ln = ln[:-1]
            if omit_empty and not ln:
                continue
            yield ln

    return scan


def re_match(pattern: str) -> Scanner:
    """scanner_re_match.go: split the stream BEFORE each regex match —
    segments run from one match start to the next; a non-empty prefix
    before the first match is its own segment."""
    rx = re.compile(pattern.encode())

    def scan(data: bytes):
        starts = [m.start() for m in rx.finditer(data)]
        # collapse zero-width adjacent boundaries
        bounds = sorted({0, *starts, len(data)})
        for a, b in zip(bounds[:-1], bounds[1:]):
            if b > a:
                yield data[a:b]

    return scan


def decompress(codec: str, inner: Scanner | None = None) -> Scanner:
    """scanner_decompress.go: decompress, then apply the nested
    scanner (default: whole payload as one message)."""

    def scan(data: bytes):
        # scanner_decompress.go goes through the registry's streaming
        # DecompressReader — notably snappy here is the FRAMED format
        from bento_ray import compression

        alias = {"deflate": "flate"}.get(codec, codec)
        try:
            raw = compression.stream_decompress(data, alias)
        except compression.CompressionError as e:
            raise ValueError(str(e)) from e
        if inner is None:
            yield raw
        else:
            yield from inner(raw)

    return scan


def tar() -> Scanner:
    """scanner_tar.go: one message per regular tar entry."""
    import tarfile

    def scan(data: bytes):
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
            for info in tf.getmembers():
                if info.isfile():
                    yield tf.extractfile(info).read()

    return scan


def csv_scanner(delimiter: str = ",") -> Scanner:
    """scanner_csv.go: header row + one JSON object message per row."""
    import csv as _csv
    import json

    def scan(data: bytes):
        rows = list(_csv.reader(io.StringIO(data.decode()),
                                delimiter=delimiter))
        if not rows:
            return
        hdr = rows[0]
        for r in rows[1:]:
            if len(r) != len(hdr):
                # encoding/csv ErrFieldCount: a row narrower or wider
                # than the header is a stream error, not a silently
                # truncated record
                raise ValueError(
                    f"csv scanner: record has {len(r)} fields, "
                    f"header has {len(hdr)}")
            yield json.dumps(dict(zip(hdr, r)),
                             separators=(",", ":")).encode()

    return scan


def json_documents() -> Scanner:
    """scanner_json.go: concatenated JSON documents."""
    import json

    def scan(data: bytes):
        dec = json.JSONDecoder()
        s = data.decode()
        i = 0
        while i < len(s):
            while i < len(s) and s[i].isspace():
                i += 1
            if i >= len(s):
                break
            v, i = dec.raw_decode(s, i)
            yield json.dumps(v, separators=(",", ":")).encode()

    return scan


def skip_bom(inner: Scanner) -> Scanner:
    """scanner_skip_bom.go: strip a UTF-8 BOM then delegate."""

    def scan(data: bytes):
        if data.startswith(b"\xef\xbb\xbf"):
            data = data[3:]
        yield from inner(data)

    return scan


def avro(raw_json: bool = False) -> Scanner:
    """internal/impl/avro/scanner.go: consume an Avro OCF stream, one
    message per datum, serialized as Avro JSON (unions wrapped
    ``{"<branch>": value}``); ``raw_json`` unwraps unions like
    goavro's standard-JSON codec. Pure-Python OCF reader
    (bento_ray/avroschema.py)."""
    import json as _json

    from bento_ray.avroschema import encode_textual, read_ocf, unwrap_unions

    def scan(data: bytes):
        r = read_ocf(data)
        for v in r.values():
            if raw_json:
                yield _json.dumps(unwrap_unions(r.schema, v),
                                  separators=(",", ":"),
                                  ensure_ascii=False).encode("utf-8")
            else:
                yield encode_textual(r.schema, v).encode("utf-8")

    return scan


def xml_documents(cast: bool = False) -> Scanner:
    """``xml_documents`` scanner (internal/impl/pure/scanner_xml.go):
    consume a stream of concatenated XML documents and emit one JSON
    message per top-level document, converted with the mxj.NewMapXml
    conventions (the reference's only operator is ``to_json``).
    ``cast=True`` casts number/bool text values (the scanner's
    ``cast`` field). Splitting mirrors the reference's xml.Decoder
    loop: each document runs from its root start-tag to the matching
    end-tag; inter-document whitespace, garbage text, processing
    instructions (``<?xml …?>``), comments and DOCTYPE are skipped;
    a malformed document ends the stream (mxj reader error parity)."""
    from bento_ray.blobl.methods import BloblangError, m_parse_xml
    from bento_ray.blobl.values import go_json_dumps

    def scan(data: bytes):
        for doc in _split_xml_docs(data):
            try:
                parsed = m_parse_xml(doc.decode("utf-8", "replace"),
                                     cast=cast)
            except BloblangError:
                return  # scanner_xml.go: reader error terminates stream
            yield go_json_dumps(parsed).encode("utf-8")

    return scan


def _split_xml_docs(data: bytes) -> Iterator[bytes]:
    i, n = 0, len(data)
    while i < n:
        lt = data.find(b"<", i)
        if lt < 0:
            return
        # skip non-element preludes between documents
        if data.startswith(b"<?", lt):
            end = data.find(b"?>", lt)
            i = n if end < 0 else end + 2
            continue
        if data.startswith(b"<!--", lt):
            end = data.find(b"-->", lt)
            i = n if end < 0 else end + 3
            continue
        if data.startswith(b"<!", lt):
            end = data.find(b">", lt)
            i = n if end < 0 else end + 1
            continue
        # element: track tag depth until the root closes
        depth = 0
        j = lt
        while j < n:
            if data.startswith(b"<!--", j):
                end = data.find(b"-->", j)
                j = n if end < 0 else end + 3
                continue
            if data.startswith(b"<![CDATA[", j):
                end = data.find(b"]]>", j)
                j = n if end < 0 else end + 3
                continue
            if data[j:j + 1] == b"<":
                gt = data.find(b">", j)
                if gt < 0:
                    j = n
                    break
                if data.startswith(b"</", j):
                    depth -= 1
                elif data.startswith(b"<?", j) or data.startswith(b"<!", j):
                    pass
                elif data[gt - 1:gt] == b"/":
                    pass  # self-closing
                else:
                    depth += 1
                j = gt + 1
                if depth == 0:
                    break
            else:
                j += 1
        yield data[lt:j]
        i = j



def warc() -> Scanner:
    """WARC/1.x record splitter (ISO 28500 — the Common Crawl container;
    no reference equivalent, added for the webtext tier). Records are
    length-delimited by their mandatory ``Content-Length`` header, so
    splitting is a linear walk — never a regex over payload bytes
    (payloads legally contain ``WARC/1.0``). Yields each record's raw
    bytes (header block + payload); compose with ``decompress('gzip')``
    for ``.warc.gz`` members, and parse fields with
    :func:`parse_warc_record`."""

    def scan(data: bytes):
        pos, n = 0, len(data)
        while pos < n:
            # tolerate inter-record CRLF (or bare-LF) padding — the
            # LF check must be one byte, a 2-byte slice mid-stream
            # reads b"\nW" and never matches
            while pos < n:
                if data[pos:pos + 2] == b"\r\n":
                    pos += 2
                elif data[pos:pos + 1] == b"\n":
                    pos += 1
                else:
                    break
            if pos >= n:
                return
            if not data.startswith(b"WARC/", pos):
                raise ValueError(
                    f"malformed WARC stream at byte {pos}: expected "
                    f"version line, got {data[pos:pos + 16]!r}")
            hdr_end = data.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                raise ValueError("truncated WARC header block")
            header = data[pos:hdr_end]
            clen = None
            for line in header.split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-length":
                    clen = int(v.strip())
                    break
            if clen is None:
                raise ValueError("WARC record missing Content-Length")
            body_start = hdr_end + 4
            if body_start + clen > n:
                # a declared Content-Length past EOF means a truncated
                # .warc — yielding the short slice would hand a
                # corrupt partial payload downstream with no error
                raise ValueError(
                    f"truncated WARC record: Content-Length {clen} "
                    f"runs {body_start + clen - n} bytes past the "
                    f"end of the stream")
            yield data[pos:body_start + clen]
            pos = body_start + clen

    return scan


def parse_warc_record(rec: bytes) -> dict:
    """Split one WARC record into (version, headers dict, payload).
    Header names are case-normalized to the spec's canonical casing via
    lower-casing keys; values keep their bytes decoded latin-1."""
    hdr_end = rec.find(b"\r\n\r\n")
    head = rec[:hdr_end].split(b"\r\n")
    version = head[0].decode("latin-1")
    headers: dict[str, str] = {}
    for line in head[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().decode("latin-1").lower()] = \
            v.strip().decode("latin-1")
    return {"version": version, "headers": headers,
            "payload": rec[hdr_end + 4:]}


def read_warc(paths, include_path: bool = False,
              compression: str | None = None):
    """Distributed WARC reader: scan files through :func:`warc` and
    parse records into a typed table (warc_type, target_uri, warc_date,
    payload). ``compression="gzip"`` composes the decompress scanner
    for ``.warc.gz`` members (scan_paths reads raw bytes — codecs are
    always the scanner's job, like the reference's file input). The
    per-record loop is the correct shape for opaque variable-length
    containers (same rationale as multimodal blobs); everything
    downstream is columnar."""
    import pyarrow as pa

    sc = warc() if compression is None else decompress(compression, warc())
    base = scan_paths(paths, sc, include_path=include_path)

    def _parse(t: pa.Table) -> pa.Table:
        types, uris, dates, payloads = [], [], [], []
        for rec in t.column("content").to_pylist():
            d = parse_warc_record(rec)
            h = d["headers"]
            types.append(h.get("warc-type", ""))
            uris.append(h.get("warc-target-uri"))
            dates.append(h.get("warc-date"))
            payloads.append(d["payload"])
        cols = {
            "warc_type": pa.array(types, pa.string()),
            "target_uri": pa.array(uris, pa.string()),
            "warc_date": pa.array(dates, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
        if include_path:
            cols["path"] = t.column("path")
        return pa.table(cols)

    return base.map_batches(_parse, batch_format="pyarrow")


def to_the_end() -> Scanner:
    """scanner_to_the_end.go: whole payload, one message."""

    def scan(data: bytes):
        if data:
            yield data

    return scan


def scan_paths(paths, scanner: Scanner, include_path: bool = True):
    """Distributed scan: read files as binary and explode each through
    the scanner — one flat_map task per file block, no driver I/O."""
    import pyarrow as pa

    import ray.data as rd

    # Ray's read_binary_files auto-decompresses by file extension
    # (.gz/.zst/.lz4/...) with no opt-out ("compression": None just
    # re-enables detection), which double-decompresses under an
    # explicit decompress scanner. The reference file input always
    # reads raw bytes and leaves codecs to the scanner, so open the
    # stream with compression explicitly off.
    try:
        from ray.data._internal.datasource.binary_datasource import (
            BinaryDatasource)

        class _RawBinaryDatasource(BinaryDatasource):
            def _open_input_source(self, filesystem, path, **open_args):
                buffer_size = open_args.pop("buffer_size", None)
                if buffer_size is None:
                    buffer_size = (
                        self._data_context.streaming_read_buffer_size)
                return filesystem.open_input_stream(
                    path, buffer_size=buffer_size, compression=None)

        ds = rd.read_datasource(
            _RawBinaryDatasource(paths, include_paths=include_path))
    except ImportError:  # internal module moved — accept auto-detect
        ds = rd.read_binary_files(paths, include_paths=include_path)

    def _f(t: pa.Table) -> pa.Table:
        out_bytes, out_path = [], []
        pcol = t.column("path").to_pylist() if include_path else None
        for i, data in enumerate(t.column("bytes").to_pylist()):
            for seg in scanner(data):
                out_bytes.append(seg)
                if include_path:
                    out_path.append(pcol[i])
        cols = {"content": pa.array(out_bytes, pa.binary())}
        if include_path:
            cols["path"] = pa.array(out_path, pa.string())
        return pa.table(cols)

    return ds.map_batches(_f, batch_format="pyarrow")


def build_scanner(cfg) -> Scanner:
    """Compile a Bento scanner config node (the ``scanner:`` field of
    the file/socket inputs — internal/component/scanner registry) into
    a Scanner. Nested scanners use the reference's field names
    (``into`` for decompress, ``child`` for skip_bom):

        {"lines": {}}
        {"decompress": {"algorithm": "gzip", "into": {"lines": {}}}}
        {"avro": {"raw_json": true}}
    """
    if cfg is None:
        return lines()
    if isinstance(cfg, str):
        cfg = {cfg: {}}
    (name, opts), = cfg.items()
    opts = opts or {}
    if name == "lines":
        return lines(custom_delimiter=opts.get("custom_delimiter"),
                     omit_empty=bool(opts.get("omit_empty", False)))
    if name == "chunker":
        return chunker(int(opts["size"]))
    if name == "re_match":
        return re_match(opts["pattern"])
    if name == "decompress":
        inner = build_scanner(opts.get("into")) if "into" in opts else None
        return decompress(opts["algorithm"], inner)
    if name == "tar":
        return tar()
    if name == "csv":
        return csv_scanner(opts.get("custom_delimiter", ","))
    if name == "json_documents":
        return json_documents()
    if name == "skip_bom":
        return skip_bom(build_scanner(opts.get("into") or
                                      opts.get("child")))
    if name == "avro":
        return avro(bool(opts.get("raw_json", False)))
    if name == "warc":
        return warc()
    if name == "xml_documents":
        if opts.get("operator", "to_json") not in ("", "to_json"):
            raise ValueError(
                f"operator not recognised: {opts['operator']}")
        return xml_documents(bool(opts.get("cast", False)))
    if name == "to_the_end":
        return to_the_end()
    raise ValueError(f"unknown scanner: {name}")
