"""MaxMind DB (.mmdb) reader for the ``geoip_*`` Bloblang methods
(reference: internal/impl/maxmind/bloblang_geoip.go → geoip2-golang).

From-scratch implementation of the public MaxMind DB file format spec
(https://maxmind.github.io/MaxMind-DB/): binary search tree with
24/28/32-bit records, the type-tagged data section (pointers, utf8,
double, bytes, uint16/32/64/128, int32, map, array, boolean, float),
and the metadata map located after the \\xab\\xcd\\xefMaxMind.com
marker. Lookups return the raw record as Python dicts with the
database's own snake_case keys; geoip.py shapes them into the
geoip2-golang struct form the reference exposes.

Validated against MaxMind's official test databases (shipped in the
reference's testdata) via the reference's own test assertions.
"""

from __future__ import annotations

import ipaddress
import struct

__all__ = ["MMDBError", "MMDBReader"]

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"


class MMDBError(ValueError):
    pass


class MMDBReader:
    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self._buf = fh.read()
        idx = self._buf.rfind(_METADATA_MARKER)
        if idx < 0:
            raise MMDBError(f"{path}: not an mmdb file (no metadata)")
        meta, _ = self._decode(idx + len(_METADATA_MARKER),
                               base=idx + len(_METADATA_MARKER))
        self.metadata = meta
        self.node_count = meta["node_count"]
        self.record_size = meta["record_size"]
        if self.record_size not in (24, 28, 32):
            raise MMDBError(f"unsupported record size {self.record_size}")
        self.ip_version = meta.get("ip_version", 6)
        self._node_bytes = self.record_size // 4
        self._tree_size = self._node_bytes * self.node_count
        self._data_start = self._tree_size + 16
        # IPv4 addresses live under 96 leading zero bits in a v6 tree;
        # resolve that subtree's root once.
        self._ipv4_start = 0
        if self.ip_version == 6:
            node = 0
            for _ in range(96):
                if node >= self.node_count:
                    break
                node = self._read_record(node, 0)
            self._ipv4_start = node

    # ------------------------------------------------------ tree

    def _read_record(self, node: int, side: int) -> int:
        base = node * self._node_bytes
        b = self._buf
        if self.record_size == 24:
            off = base + 3 * side
            return int.from_bytes(b[off:off + 3], "big")
        if self.record_size == 32:
            off = base + 4 * side
            return int.from_bytes(b[off:off + 4], "big")
        # 28-bit: middle byte carries the high nibbles of both sides
        if side == 0:
            return ((b[base + 3] & 0xF0) << 20) | \
                int.from_bytes(b[base:base + 3], "big")
        return ((b[base + 3] & 0x0F) << 24) | \
            int.from_bytes(b[base + 4:base + 7], "big")

    def lookup(self, ip: str):
        """→ record dict/value, or None when the IP is not in the DB."""
        addr = ipaddress.ip_address(ip)
        if addr.version == 6 and self.ip_version == 4:
            raise MMDBError("IPv6 lookup in an IPv4-only database")
        if addr.version == 4:
            bits, nbits = int(addr), 32
            node = self._ipv4_start
        else:
            bits, nbits = int(addr), 128
            node = 0
        for i in range(nbits - 1, -1, -1):
            if node >= self.node_count:
                break
            node = self._read_record(node, (bits >> i) & 1)
        if node == self.node_count:
            return None
        if node < self.node_count:
            raise MMDBError("invalid search tree")
        offset = node - self.node_count + self._tree_size
        if offset < self._data_start:
            raise MMDBError("record pointer into the separator")
        value, _ = self._decode(offset, base=self._data_start)
        return value

    # ------------------------------------------------------ data

    def _decode(self, offset: int, base: int):
        b = self._buf
        ctrl = b[offset]
        offset += 1
        dtype = ctrl >> 5
        if dtype == 1:  # pointer
            ss = (ctrl >> 3) & 0x3
            vbits = ctrl & 0x7
            if ss == 0:
                ptr = (vbits << 8) | b[offset]
                offset += 1
            elif ss == 1:
                ptr = ((vbits << 16) | int.from_bytes(
                    b[offset:offset + 2], "big")) + 2048
                offset += 2
            elif ss == 2:
                ptr = ((vbits << 24) | int.from_bytes(
                    b[offset:offset + 3], "big")) + 526336
                offset += 3
            else:
                ptr = int.from_bytes(b[offset:offset + 4], "big")
                offset += 4
            value, _ = self._decode(base + ptr, base)
            return value, offset
        if dtype == 0:  # extended type
            dtype = b[offset] + 7
            offset += 1
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + b[offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(b[offset:offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(b[offset:offset + 3], "big")
            offset += 3

        if dtype == 2:  # utf8
            return b[offset:offset + size].decode("utf-8"), offset + size
        if dtype == 3:  # double
            return struct.unpack(">d", b[offset:offset + 8])[0], offset + 8
        if dtype == 4:  # bytes
            return bytes(b[offset:offset + size]), offset + size
        if dtype in (5, 6, 9, 10):  # uint16/32/64/128
            return int.from_bytes(b[offset:offset + size], "big"), \
                offset + size
        if dtype == 7:  # map
            out = {}
            for _ in range(size):
                key, offset = self._decode(offset, base)
                val, offset = self._decode(offset, base)
                out[key] = val
            return out, offset
        if dtype == 8:  # int32
            return int.from_bytes(b[offset:offset + size], "big",
                                  signed=True), offset + size
        if dtype == 11:  # array
            out = []
            for _ in range(size):
                val, offset = self._decode(offset, base)
                out.append(val)
            return out, offset
        if dtype == 14:  # boolean (size IS the value)
            return size != 0, offset
        if dtype == 15:  # float
            return struct.unpack(">f", b[offset:offset + 4])[0], offset + 4
        raise MMDBError(f"unsupported mmdb data type {dtype}")
