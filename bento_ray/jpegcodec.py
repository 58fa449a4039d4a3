"""Pure-Python + numpy baseline JPEG codec (ITU-T T.81).

Decoder: baseline sequential (SOF0/1) AND progressive (SOF2) DCT,
8-bit samples, any component count/sampling factors up to 2x2, restart
intervals (DRI/RSTn), 8/16-bit quantization tables, multi-scan
progressive with spectral selection, successive approximation and
EOB runs (spec G.2 refinement algorithm). Everything is table-driven
FROM THE FILE — the DQT/DHT segments are parsed and used, never
assumed — so any spec-conformant Huffman JPEG decodes, not just this
encoder's output. Arithmetic coding, 12-bit and hierarchical modes
raise MediaDecodeError and callers take their documented fallback.

Encoders: baseline sequential with the JPEG Annex-K example
quantization and Huffman tables (public spec constants),
libjpeg-convention quality scaling, 4:4:4 or 4:2:0 chroma subsampling,
optional restart interval; and a progressive encoder whose scan script
(DC first/refine, per-component AC first/refine) exercises all four
progressive scan types. Both exist so tests and the synthetic media
corpus can round-trip REAL JPEG payloads without PIL.

The 8x8 DCT runs as two numpy matmuls against the orthonormal DCT-II
matrix over all blocks at once; the per-symbol Huffman loops are plain
Python (fine for the thumbnail-scale payloads the multimodal stages
process; a training-scale deployment would swap in a SIMD decoder
behind the same function signature).

Reference behavior anchor: the reference repo treats media as opaque
bytes (`/root/reference/internal/message/part.go`); this implements the
decode plugin a training-data pipeline registers on top.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]


# Shared with mediacodec via the mediaerrors leaf module — one class
# under either import order (a bottom-of-module rebinding previously
# failed silently when jpegcodec was imported first).
from bento_ray.mediaerrors import MediaDecodeError  # noqa: E402,F401

# ---------------------------------------------------------------------------
# shared constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)

# orthonormal DCT-II matrix: forward F = C @ B @ C.T, inverse B = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * \
            np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K.1/K.2 example quantization tables (zigzag-free, row-major)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# Annex K.3 example Huffman tables: (bits[1..16], values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(length, code) pairs in symbol order from a 16-entry bits list."""
    out = []
    code = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code))
            code += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing; stops at any other marker (RSTn handled by caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                # pad with 1-bits past the end (spec: fill bits)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self):
        """Discard to byte boundary and consume an expected RSTn."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip fill bytes to the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                m = d[self.pos + 1]
                if 0xD0 <= m <= 0xD7:
                    self.pos += 2
                    self.marker = None
                    return
                self.marker = m
                return
            self.pos += 1


class _HuffTable:
    """First-level 8-bit lookup + slow path for longer codes."""

    def __init__(self, bits: list[int], values: list[int]):
        codes = _canonical_codes(bits)
        self.lut = [None] * 256  # (symbol, length) for codes ≤ 8 bits
        self.long: dict[tuple[int, int], int] = {}
        self.maxlen = 0
        for (length, code), sym in zip(codes, values):
            self.maxlen = max(self.maxlen, length)
            if length <= 8:
                base = code << (8 - length)
                for i in range(1 << (8 - length)):
                    self.lut[base + i] = (sym, length)
            else:
                self.long[(length, code)] = sym

    def decode(self, br: _BitReader) -> int:
        if br.nbits < 16:
            br._fill()
        peek8 = (br.acc >> (br.nbits - 8)) & 0xFF
        hit = self.lut[peek8]
        if hit is not None:
            sym, length = hit
            br.nbits -= length
            br.acc &= (1 << br.nbits) - 1
            return sym
        # long code: extend bit by bit
        code = peek8
        length = 8
        br.nbits -= 8
        br.acc &= (1 << br.nbits) - 1
        while length < self.maxlen + 1:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.long.get((length, code))
            if sym is not None:
                return sym
        raise MediaDecodeError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB (or (H, W) for grayscale
    promoted by the caller). Any malformed/truncated input raises
    MediaDecodeError — callers rely on that for their fallback path."""
    try:
        return _decode_jpeg(payload)
    except MediaDecodeError:
        raise
    except (struct.error, IndexError, KeyError, StopIteration,
            ValueError) as e:
        raise MediaDecodeError(f"malformed JPEG: {e}") from e


def _next_marker(payload: bytes, pos: int) -> int:
    """Position of the next real marker (skips entropy bytes, 0xFF00
    stuffing and 0xFF fill bytes)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"\xff\xd8"):
        raise MediaDecodeError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    w = h = 0
    hmax = vmax = 1
    mcux = mcuy = 0
    restart = 0
    progressive = False
    sos_seen = False
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise MediaDecodeError("bad marker alignment")
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        if seglen < 2:
            raise MediaDecodeError("invalid zero-length segment")
        seg = payload[pos + 2:pos + seglen]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8) \
                        .astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2") \
                        .astype(np.int32)
                    p += 128
                dq = np.zeros(64, np.int32)
                dq[ZIGZAG] = tbl
                qt[tq] = dq.reshape(8, 8)
        elif m == 0xC4:  # DHT (may be redefined between scans)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                huff[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = m == 0xC2
            prec = seg[0]
            if prec != 8:
                raise MediaDecodeError(f"{prec}-bit JPEG unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq, "pred": 0})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # MCU-padded quantized-coefficient grid, filled scan by
                # scan (one scan total for baseline)
                c["coef"] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), np.int32)
                # non-interleaved scan coverage: ceil of the component's
                # own pixel dims
                comp_h = -(-(h * c["v"]) // vmax)
                comp_w = -(-(w * c["h"]) // hmax)
                c["nby"] = -(-comp_h // 8)
                c["nbx"] = -(-comp_w // 8)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise MediaDecodeError("unsupported JPEG mode (arithmetic/"
                                   "lossless/hierarchical)")
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if not comps:
                raise MediaDecodeError("SOS before SOF")
            ns = seg[0]
            order = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                c = next(c for c in comps if c["id"] == cs)
                c["dc"] = huff.get((0, tt >> 4))
                c["ac"] = huff.get((1, tt & 15))
                order.append(c)
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = a >> 4, a & 15
            if progressive:
                # spec B.2.3: DC scans are Ss=Se=0; AC scans cover a
                # band within 1..63 and carry exactly one component
                if ss == 0 and se != 0:
                    raise MediaDecodeError(
                        "invalid progressive scan header (Ss=0, Se>0)")
                if ss > 0 and (se < ss or se > 63 or ns != 1):
                    raise MediaDecodeError(
                        "invalid progressive AC scan header")
            else:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_one_scan(
                payload, pos + seglen, order, ss, se, ah, al,
                restart, mcux, mcuy)
            sos_seen = True
            continue
        pos += seglen
    if not sos_seen:
        raise MediaDecodeError("no SOS marker found")
    return _finish(comps, qt, w, h, hmax, vmax)


def _block_first(br: _BitReader, c: dict, blk: np.ndarray, ss: int,
                 se: int, al: int, state: dict) -> None:
    """First-pass band decode into one block (baseline = ss0/se63/al0;
    handles progressive DC-only, AC-only and EOB runs uniformly)."""
    zz = ZIGZAG
    if ss == 0:
        s = c["dc"].decode(br)
        diff = _extend(br.read(s), s) if s else 0
        c["pred"] += diff
        blk[0] = c["pred"] << al
        k = 1
    else:
        k = ss
    if k > se:
        return
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    ac_t = c["ac"]
    while k <= se:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1 + (br.read(r) if r else 0)
            break
        k += r
        if k > se:
            raise MediaDecodeError("AC coefficient index overflow")
        blk[zz[k]] = _extend(br.read(s), s) << al
        k += 1


def _block_refine(br: _BitReader, c: dict, blk: np.ndarray, ss: int,
                  se: int, al: int, state: dict) -> None:
    """Successive-approximation refinement pass (Ah > 0) — the spec
    G.2 correction-bit algorithm (mirrors libjpeg's jdphuff)."""
    zz = ZIGZAG
    p1 = 1 << al
    m1 = -1 << al
    if ss == 0:
        # DC refinement: one bit; arithmetic-shift point transform
        # makes two's-complement OR the correct update
        if br.read(1):
            blk[0] |= p1
        return
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = c["ac"].decode(br)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    state["eobrun"] = (1 << r) + (br.read(r) if r else 0)
                    break
                val = 0  # ZRL: pass 16 zero-history coefficients
            else:
                val = p1 if br.read(1) else m1
            while k <= se:
                z = zz[k]
                cur = int(blk[z])
                if cur != 0:
                    if br.read(1) and (cur & p1) == 0:
                        blk[z] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[zz[k]] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = zz[k]
            cur = int(blk[z])
            if cur != 0:
                if br.read(1) and (cur & p1) == 0:
                    blk[z] = cur + (p1 if cur >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _decode_one_scan(payload: bytes, pos: int, order: list[dict],
                     ss: int, se: int, ah: int, al: int, restart: int,
                     mcux: int, mcuy: int) -> int:
    """Decode one SOS's entropy data into the components' coefficient
    grids; returns the payload position of the next marker."""
    for c in order:
        if ss == 0 and ah == 0 and c["dc"] is None:
            raise MediaDecodeError("scan references undefined DC table")
        if se > 0 and c["ac"] is None:
            raise MediaDecodeError("scan references undefined AC table")
        c["pred"] = 0
    br = _BitReader(payload, pos)
    state = {"eobrun": 0}
    decode_block = _block_refine if ah else _block_first
    unit = 0
    if len(order) > 1:
        # interleaved MCU order (multi-component scans: baseline frames
        # and progressive DC scans). Single-component scans are always
        # non-interleaved per the spec — one block per MCU over the
        # component's own ceil-grid, even in baseline mode.
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and unit and unit % restart == 0:
                    br.align_to_marker()
                    state["eobrun"] = 0
                    for c in order:
                        c["pred"] = 0
                unit += 1
                for c in order:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = c["coef"][my * c["v"] + by,
                                            mx * c["h"] + bx]
                            decode_block(br, c, blk, ss, se, al, state)
    else:
        # non-interleaved: raster over the component's own block grid
        c = order[0]
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                if restart and unit and unit % restart == 0:
                    br.align_to_marker()
                    state["eobrun"] = 0
                    c["pred"] = 0
                unit += 1
                decode_block(br, c, c["coef"][by, bx], ss, se, al, state)
    return _next_marker(payload, br.pos)


def _finish(comps: list[dict], qt: dict, w: int, h: int,
            hmax: int, vmax: int) -> np.ndarray:
    """Dequantize + IDCT every block (batched matmuls per component),
    upsample chroma, convert to RGB."""
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise MediaDecodeError("undefined quantization table")
        q = qt[c["tq"]].astype(np.float64)
        nby, nbx, _ = c["coef"].shape
        f = c["coef"].reshape(nby, nbx, 8, 8) * q
        pix = np.einsum("xu,nmuv,vy->nmxy", _C.T, f, _C, optimize=True)
        p = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise MediaDecodeError(f"{len(planes)}-component JPEG unsupported")
    Y, Cb, Cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        Y + 1.402 * Cr,
        Y - 0.344136 * Cb - 0.714136 * Cr,
        Y + 1.772 * Cb,
    ], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Quantized zigzag block → entropy stream; returns new DC pred."""
    dc = int(blk[0])
    diff = dc - pred
    s = _size_cat(diff)
    length, code = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
    for k in range(1, 64):
        v = int(blk[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = _size_cat(v)
        length, code = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_codes[0x00]
        bw.write(code, length)
    return dc


def _prep_blocks(px: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: color convert, subsample, pad, DCT,
    quantize. Returns (gray, h, w, samp[(ch, cv)], ql, qc,
    comp_blocks, hmax, vmax, mcux, mcuy) — comp_blocks[i] is the
    MCU-padded (nby, nbx, 64) zigzag quantized coefficient grid."""
    px = np.asarray(px)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w = px.shape[:2]
    ql = _scale_q(_Q_LUMA, quality)
    qc = _scale_q(_Q_CHROMA, quality)
    if gray:
        Y = px[:, :, 0].astype(np.float64)
        planes = [(Y, ql, 1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        Y = 0.299 * r + 0.587 * g + 0.114 * b
        Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            planes = [(Y, ql, 2, 2), (Cb, qc, 1, 1), (Cr, qc, 1, 1)]
        else:
            planes = [(Y, ql, 1, 1), (Cb, qc, 1, 1), (Cr, qc, 1, 1)]
    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad + (for chroma under 4:2:0) box-average downsample, then DCT
    comp_blocks = []
    for plane, q, ch, cv in planes:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        if ch < hmax or cv < vmax:
            # downsample by box mean over (vmax/cv, hmax/ch)
            fy, fx = vmax // cv, hmax // ch
            eh, ew = -(-h // fy) * fy, -(-w // fx) * fx
            tmp = np.empty((eh, ew))
            tmp[:h, :w] = plane
            tmp[h:, :w] = plane[-1:, :]
            tmp[:, w:] = tmp[:, w - 1:w]
            plane = tmp.reshape(eh // fy, fy, ew // fx, fx).mean((1, 3))
        sh, sw = plane.shape
        padded = np.empty((ph, pw))
        padded[:sh, :sw] = plane
        padded[sh:, :sw] = plane[-1:, :]
        padded[:, sw:] = padded[:, sw - 1:sw]
        comp_blocks.append(_dct_quant(padded - 128.0, q))
    samp = [(ch, cv) for _, _, ch, cv in planes]
    return (gray, h, w, samp, ql, qc, comp_blocks,
            hmax, vmax, mcux, mcuy)


def _jfif_header(gray: bool, h: int, w: int, samp, ql, qc,
                 sof_marker: int, restart: int = 0) -> bytearray:
    """SOI + APP0 + DQT(s) + SOF + (optional DRI) common prologue."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + ql[ZIGZAG].astype(np.uint8).tobytes())
    if not gray:
        out += _seg(0xDB,
                    bytes([0x01]) + qc[ZIGZAG].astype(np.uint8).tobytes())
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (ch, cv) in enumerate(samp):
        sof += bytes([i + 1, (ch << 4) | cv, 0 if i == 0 else 1])
    out += _seg(sof_marker, sof)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(px: np.ndarray, quality: int = 85,
                subsample: bool = False, restart: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) gray) → baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 chroma (2x2 MCUs); ``restart`` > 0
    writes a DRI segment and RSTn markers every that-many MCUs."""
    (gray, h, w, samp, ql, qc, comp_blocks,
     hmax, vmax, mcux, mcuy) = _prep_blocks(px, quality, subsample)

    # symbol → (length, code)
    dc_l = dict(zip(_DC_LUMA[1], _canonical_codes(_DC_LUMA[0])))
    ac_l = dict(zip(_AC_LUMA[1], _canonical_codes(_AC_LUMA[0])))
    dc_c = dict(zip(_DC_CHROMA[1], _canonical_codes(_DC_CHROMA[0])))
    ac_c = dict(zip(_AC_CHROMA[1], _canonical_codes(_AC_CHROMA[0])))

    bw = _BitWriter()
    preds = [0] * len(samp)
    mcu_count = 0
    rst_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_i & 7)])
                rst_i += 1
                preds = [0] * len(samp)
            mcu_count += 1
            for ci, (ch, cv) in enumerate(samp):
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(cv):
                    for bx in range(ch):
                        blk = comp_blocks[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_block(bw, blk, preds[ci],
                                                  dct, act)
    bw.flush()

    out = _jfif_header(gray, h, w, samp, ql, qc, 0xC0, restart)
    for tc, th, (bits, vals) in ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
                                 (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)):
        if gray and th == 1:
            continue
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                    + bytes(vals))
    nc = 1 if gray else 3
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _dct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) level-shifted plane → (nby, nbx, 64) quantized ZIGZAG
    coefficient blocks (two matmuls for the whole plane)."""
    hh, ww = plane.shape
    nby, nbx = hh // 8, ww // 8
    b = plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ux,nmxy,vy->nmuv", _C, b, _C, optimize=True)
    qd = np.round(f / q.reshape(8, 8)).astype(np.int32) \
        .reshape(nby, nbx, 64)
    return qd[:, :, ZIGZAG]


# ---------------------------------------------------------------------------
# progressive encoder

def _progressive_ac_table() -> tuple[list[int], list[int]]:
    """Fixed all-8-bit AC Huffman table for progressive scans: the
    Annex-K example tables lack the EOBn (r<<4, r=1..14) symbols that
    end-of-band runs need, so progressive scans carry this uniform
    table instead (valid canonical code, suboptimal compression)."""
    vals = [r << 4 for r in range(15)]          # EOB0..EOB14
    vals.append(0xF0)                           # ZRL
    vals += [(r << 4) | s for r in range(16) for s in range(1, 11)]
    bits = [0] * 16
    bits[7] = len(vals)                         # every code 8 bits
    return bits, vals


def _flush_eobrun(bw: _BitWriter, ac: dict, eobrun: int,
                  bebuf: list[int] | None = None) -> int:
    """Emit a pending EOBn symbol (plus its extra bits), then any
    buffered refinement correction bits. Returns 0 (the new run)."""
    if eobrun:
        r = eobrun.bit_length() - 1
        ln, code = ac[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(eobrun - (1 << r), r)
        if bebuf:
            for b in bebuf:
                bw.write(b, 1)
            bebuf.clear()
    return 0


def encode_jpeg_progressive(px: np.ndarray, quality: int = 85,
                            subsample: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) gray) → progressive (SOF2) JFIF
    bytes. Scan script exercises every progressive scan type: DC first
    (Al=1, interleaved), DC refine, then per component AC first
    (Ss=1..63, Al=1) and AC refine — so a conforming decoder's four
    code paths all run. Pixel output is identical to the baseline
    stream of the same image: the quantized coefficients are the same,
    only the entropy coding differs."""
    (gray, h, w, samp, ql, qc, comp_blocks,
     hmax, vmax, mcux, mcuy) = _prep_blocks(px, quality, subsample)
    nc = 1 if gray else 3
    AL = 1

    grids = []
    for ch, cv in samp:
        comp_h = -(-(h * cv) // vmax)
        comp_w = -(-(w * ch) // hmax)
        grids.append((-(-comp_h // 8), -(-comp_w // 8)))

    dc_l = dict(zip(_DC_LUMA[1], _canonical_codes(_DC_LUMA[0])))
    dc_c = dict(zip(_DC_CHROMA[1], _canonical_codes(_DC_CHROMA[0])))
    pbits, pvals = _progressive_ac_table()
    ac_p = dict(zip(pvals, _canonical_codes(pbits)))

    out = _jfif_header(gray, h, w, samp, ql, qc, 0xC2)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0])
                + bytes(_DC_LUMA[1]))
    if not gray:
        out += _seg(0xC4, bytes([0x01]) + bytes(_DC_CHROMA[0])
                    + bytes(_DC_CHROMA[1]))
    out += _seg(0xC4, bytes([0x10]) + bytes(pbits) + bytes(pvals))

    def sos_hdr(specs, ss, se, ah, al):
        body = bytes([len(specs)])
        for cid, tt in specs:
            body += bytes([cid, tt])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    all_specs = [(i + 1, 0x00 if i == 0 else 0x11) for i in range(nc)]

    def dc_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (ch, cv) in enumerate(samp):
                    for by in range(cv):
                        for bx in range(ch):
                            yield ci, comp_blocks[ci][my * cv + by,
                                                      mx * ch + bx]

    # scan 1: DC first (point transform = arithmetic shift)
    out += sos_hdr(all_specs, 0, 0, 0, AL)
    bw = _BitWriter()
    preds = [0] * nc
    for ci, blk in dc_blocks():
        dc = int(blk[0]) >> AL
        diff = dc - preds[ci]
        preds[ci] = dc
        s = _size_cat(diff)
        ln, code = (dc_l if ci == 0 else dc_c)[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += bw.out

    # scan 2: DC refine — one raw bit per block, no entropy coding
    out += sos_hdr(all_specs, 0, 0, AL, 0)
    bw = _BitWriter()
    for ci, blk in dc_blocks():
        bw.write(int(blk[0]) & 1, 1)
    bw.flush()
    out += bw.out

    # per-component AC scans (single-component, non-interleaved)
    for ci in range(nc):
        nby, nbx = grids[ci]

        # AC first: band 1..63 of sign*(abs>>AL), with EOB runs
        out += sos_hdr([(ci + 1, 0x00)], 1, 63, 0, AL)
        bw = _BitWriter()
        eobrun = 0
        for by in range(nby):
            for bx in range(nbx):
                vals = comp_blocks[ci][by, bx][1:64].astype(np.int64)
                t = np.sign(vals) * (np.abs(vals) >> AL)
                nz = np.flatnonzero(t)
                if len(nz) == 0:
                    eobrun += 1
                    if eobrun == 32767:
                        eobrun = _flush_eobrun(bw, ac_p, eobrun)
                    continue
                eobrun = _flush_eobrun(bw, ac_p, eobrun)
                run = 0
                last = int(nz[-1])
                for k in range(last + 1):
                    v = int(t[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_p[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _size_cat(v)
                    ln, code = ac_p[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 62:
                    eobrun += 1
        _flush_eobrun(bw, ac_p, eobrun)
        bw.flush()
        out += bw.out

        # AC refine: correction bits (spec G.1.2.3 / libjpeg jcphuff)
        out += sos_hdr([(ci + 1, 0x00)], 1, 63, AL, 0)
        bw = _BitWriter()
        eobrun = 0
        bebuf: list[int] = []
        for by in range(nby):
            for bx in range(nbx):
                vals = comp_blocks[ci][by, bx][1:64].astype(np.int64)
                absv = np.abs(vals)
                new_nz = np.flatnonzero(absv == 1)
                eob_k = int(new_nz[-1]) if len(new_nz) else -1
                r = 0
                pending: list[int] = []
                for k in range(63):
                    t = int(absv[k])
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_k:
                        eobrun = _flush_eobrun(bw, ac_p, eobrun, bebuf)
                        ln, code = ac_p[0xF0]
                        bw.write(code, ln)
                        r -= 16
                        for b in pending:
                            bw.write(b, 1)
                        pending.clear()
                    if t > 1:
                        # history coefficient: buffered correction bit
                        pending.append(t & 1)
                        continue
                    # newly nonzero at this pass
                    eobrun = _flush_eobrun(bw, ac_p, eobrun, bebuf)
                    ln, code = ac_p[(r << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if vals[k] > 0 else 0, 1)
                    for b in pending:
                        bw.write(b, 1)
                    pending.clear()
                    r = 0
                if r > 0 or pending:
                    eobrun += 1
                    bebuf.extend(pending)
                    if eobrun == 32767 or len(bebuf) > 900:
                        eobrun = _flush_eobrun(bw, ac_p, eobrun, bebuf)
        _flush_eobrun(bw, ac_p, eobrun, bebuf)
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)
