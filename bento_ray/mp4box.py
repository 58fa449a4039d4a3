"""ISO BMFF (MP4) container parsing — pure Python.

Parses the box tree (ftyp/moov/trak/mdia/stbl…) and extracts the
metadata a data pipeline actually filters on: brand, movie duration,
per-track codec fourcc, dimensions, sample counts and frame rate.
SAMPLE DECODE (H.264/AAC) stays out of scope — this is container
metadata only; the multimodal stage records ``decoder='container'``
for rows whose metadata is real but whose frames are not decoded.

``encode_mp4_stub`` writes a minimal valid single-video-track MP4
(ftyp + moov with a full stbl + mdat of deterministic dummy samples)
so tests and the synthetic corpus can exercise the parser against real
box structure without ffmpeg.

Format reference: ISO/IEC 14496-12 (public spec); box layouts also
documented in every mp4 parsing library.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_mp4", "encode_mp4_stub", "encode_mp4_avc",
           "extract_video_samples", "Mp4ParseError"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"mvex", b"udta"}


class Mp4ParseError(ValueError):
    pass


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4ParseError("truncated 64-bit box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise Mp4ParseError(f"bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _full_box(data: bytes, s: int) -> tuple[int, int]:
    version = data[s]
    return version, s + 4


def parse_mp4(payload: bytes) -> dict:
    """→ {brand, timescale, duration_ms, tracks: [{id, kind, codec,
    width, height, n_samples, duration_ms, fps}]}."""
    if len(payload) < 12:
        raise Mp4ParseError("too short for an MP4")
    n = len(payload)
    ftyp = _find(payload, 0, n, b"ftyp")
    if ftyp is None:
        raise Mp4ParseError("missing ftyp")
    brand = payload[ftyp[0]:ftyp[0] + 4].decode("ascii", "replace")
    moov = _find(payload, 0, n, b"moov")
    if moov is None:
        raise Mp4ParseError("missing moov")
    out = {"brand": brand, "timescale": 0, "duration_ms": 0, "tracks": []}
    mvhd = _find(payload, moov[0], moov[1], b"mvhd")
    if mvhd:
        v, p = _full_box(payload, mvhd[0])
        if v == 1:
            ts, dur = struct.unpack_from(">IQ", payload, p + 16)
        else:
            _, _, ts, dur = struct.unpack_from(">IIII", payload, p)
        out["timescale"] = ts
        out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
    for t, s, e in _boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        out["tracks"].append(_parse_trak(payload, s, e))
    return out


def _parse_trak(data: bytes, s: int, e: int) -> dict:
    tr = {"id": 0, "kind": "unknown", "codec": "", "width": 0,
          "height": 0, "n_samples": 0, "duration_ms": 0, "fps": 0.0}
    tkhd = _find(data, s, e, b"tkhd")
    if tkhd:
        v, p = _full_box(data, tkhd[0])
        tr["id"] = struct.unpack_from(
            ">I", data, p + (16 if v == 1 else 8))[0]
        # width/height: last 8 bytes, 16.16 fixed point
        tr["width"] = struct.unpack_from(">I", data, tkhd[1] - 8)[0] >> 16
        tr["height"] = struct.unpack_from(">I", data, tkhd[1] - 4)[0] >> 16
    mdia = _find(data, s, e, b"mdia")
    if not mdia:
        return tr
    mts = 0
    mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
    if mdhd:
        v, p = _full_box(data, mdhd[0])
        if v == 1:
            mts, dur = struct.unpack_from(">IQ", data, p + 16)
        else:
            _, _, mts, dur = struct.unpack_from(">IIII", data, p)
        tr["duration_ms"] = int(dur * 1000 // mts) if mts else 0
    hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        kind = data[hdlr[0] + 8:hdlr[0] + 12]
        tr["kind"] = {b"vide": "video", b"soun": "audio",
                      b"text": "text"}.get(kind, kind.decode("ascii",
                                                             "replace"))
    minf = _find(data, mdia[0], mdia[1], b"minf")
    stbl = _find(data, minf[0], minf[1], b"stbl") if minf else None
    if not stbl:
        return tr
    stsd = _find(data, stbl[0], stbl[1], b"stsd")
    if stsd:
        _, p = _full_box(data, stsd[0])
        cnt = struct.unpack_from(">I", data, p)[0]
        if cnt:
            tr["codec"] = data[p + 8:p + 12].decode("ascii", "replace")
    stsz = _find(data, stbl[0], stbl[1], b"stsz")
    if stsz:
        _, p = _full_box(data, stsz[0])
        tr["n_samples"] = struct.unpack_from(">I", data, p + 4)[0]
    stts = _find(data, stbl[0], stbl[1], b"stts")
    if stts and mts:
        _, p = _full_box(data, stts[0])
        nent = struct.unpack_from(">I", data, p)[0]
        total_samples = total_ticks = 0
        for i in range(nent):
            cnt, delta = struct.unpack_from(">II", data, p + 4 + 8 * i)
            total_samples += cnt
            total_ticks += cnt * delta
        if total_ticks:
            tr["fps"] = round(total_samples * mts / total_ticks, 3)
    return tr


def extract_video_samples(payload: bytes) -> tuple[bytes, list[bytes]]:
    """→ (avcC record, raw sample bytes) for the first AVC video track.

    Walks stsd (for the avcC child of the visual sample entry), stsz
    (sample sizes) and stsc+stco (sample→chunk→offset mapping). Raises
    Mp4ParseError when the track carries no avcC (e.g. the stub's
    config-less samples) — callers take their fallback path."""
    n = len(payload)
    moov = _find(payload, 0, n, b"moov")
    if moov is None:
        raise Mp4ParseError("missing moov")
    for t, s, e in _boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(payload, s, e, b"mdia")
        if not mdia:
            continue
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        if not hdlr or payload[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        stbl = _find(payload, minf[0], minf[1], b"stbl") if minf else None
        if not stbl:
            continue
        stsd = _find(payload, stbl[0], stbl[1], b"stsd")
        if not stsd:
            continue
        _, p = _full_box(payload, stsd[0])
        if struct.unpack_from(">I", payload, p)[0] < 1:
            continue
        vse_size = struct.unpack_from(">I", payload, p + 4)[0]
        # avcC is a child box after the 78-byte VisualSampleEntry body
        avcc_span = _find(payload, p + 4 + 8 + 78, p + 4 + vse_size,
                          b"avcC")
        if avcc_span is None:
            raise Mp4ParseError("video track has no avcC config")
        avcc = payload[avcc_span[0]:avcc_span[1]]
        stsz = _find(payload, stbl[0], stbl[1], b"stsz")
        stco = _find(payload, stbl[0], stbl[1], b"stco")
        stsc = _find(payload, stbl[0], stbl[1], b"stsc")
        if not (stsz and stco and stsc):
            raise Mp4ParseError("missing sample tables")
        _, p = _full_box(payload, stsz[0])
        uniform, count = struct.unpack_from(">II", payload, p)
        sizes = [uniform] * count if uniform else [
            struct.unpack_from(">I", payload, p + 8 + 4 * i)[0]
            for i in range(count)]
        _, p = _full_box(payload, stco[0])
        n_chunks = struct.unpack_from(">I", payload, p)[0]
        offsets = [struct.unpack_from(">I", payload, p + 4 + 4 * i)[0]
                   for i in range(n_chunks)]
        _, p = _full_box(payload, stsc[0])
        n_ent = struct.unpack_from(">I", payload, p)[0]
        ents = [struct.unpack_from(">III", payload, p + 4 + 12 * i)
                for i in range(n_ent)]  # (first_chunk, per_chunk, desc)
        # samples per chunk from the stsc run-length table
        per_chunk = []
        for i, (first, cnt, _desc) in enumerate(ents):
            last = ents[i + 1][0] - 1 if i + 1 < n_ent else n_chunks
            per_chunk.extend([cnt] * (last - first + 1))
        samples = []
        si = 0
        for ci, off in enumerate(offsets):
            pos = off
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= count:
                    break
                sz = sizes[si]
                if pos + sz > n:
                    raise Mp4ParseError("sample extends past payload")
                samples.append(payload[pos:pos + sz])
                pos += sz
                si += 1
        if si != count:
            raise Mp4ParseError("sample table inconsistent")
        return avcc, samples
    raise Mp4ParseError("no video track")


def encode_mp4_stub(width: int = 64, height: int = 48, n_frames: int = 24,
                    fps: int = 12, codec: bytes = b"avc1",
                    seed: int = 0, samples=None, avcc: bytes = b"") -> bytes:
    """Minimal valid single-video-track MP4: real box structure. By
    default sample bytes are deterministic dummies (NOT decodable
    video); pass ``samples`` + ``avcc`` (e.g. from
    h264codec.encode_avc_iframes) to embed REAL decodable H.264."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", len(body) + 8, btype) + body

    if samples is None:
        rng = np.random.RandomState(seed)
        samples = [rng.bytes(32 + int(rng.randint(0, 32)))
                   for _ in range(n_frames)]
    else:
        n_frames = len(samples)
    mdat_body = b"".join(samples)

    timescale = 1000
    mdts = fps * 1000
    dur = n_frames * 1000 // fps
    mdur = n_frames * 1000

    matrix = struct.pack(">9I", 0x00010000, 0, 0,
                         0, 0x00010000, 0,
                         0, 0, 0x40000000)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    mvhd = box(b"mvhd",
               struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)
               + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, vol
               + b"\x00" * 8                                  # reserved
               + matrix
               + b"\x00" * 24                                 # pre_defined
               + struct.pack(">I", 2))                        # next track
    tkhd = box(b"tkhd",
               struct.pack(">I", 0x00000007)                  # v0, enabled
               + struct.pack(">IIIII", 0, 0, 1, 0, dur)       # id=1
               + b"\x00" * 8                                  # reserved
               + struct.pack(">HHHH", 0, 0, 0, 0)             # layer/alt/vol
               + matrix
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, mdts, mdur,
                                    0x55C4, 0))
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12
               + b"VideoHandler\x00")
    # sample description: avc1 visual sample entry (no avcC config —
    # parser-visible structure only)
    vse = (b"\x00" * 6 + struct.pack(">H", 1)
           + b"\x00" * 16
           + struct.pack(">HH", width, height)
           + struct.pack(">II", 0x00480000, 0x00480000)
           + b"\x00" * 4 + struct.pack(">H", 1)
           + b"\x00" * 32
           + struct.pack(">Hh", 0x0018, -1))
    if avcc:
        vse += box(b"avcC", avcc)
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + box(codec, vse))
    stts = box(b"stts", struct.pack(">B3xIII", 0, 1, n_frames, 1000))
    stsc = box(b"stsc", struct.pack(">B3xIIII", 0, 1, 1, n_frames, 1))
    stsz = box(b"stsz", struct.pack(">B3xII", 0, 0, n_frames)
               + b"".join(struct.pack(">I", len(sb)) for sb in samples))
    # chunk offset is filled after the full prefix length is known
    stbl_wo = (stsd, stts, stsc, stsz)

    def build(stco_off: int) -> bytes:
        stco = box(b"stco", struct.pack(">B3xII", 0, 1, stco_off))
        stbl = box(b"stbl", b"".join(stbl_wo) + stco)
        minf = box(b"minf",
                   box(b"vmhd", struct.pack(">B3xHHHH", 0, 1, 0, 0, 0))
                   + box(b"dinf", box(b"dref", struct.pack(">B3xI", 0, 1)
                         + box(b"url ", b"\x00\x00\x00\x01")))
                   + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        moov = box(b"moov", mvhd + trak)
        return ftyp + moov

    prefix = build(0)
    mdat_off = len(prefix) + 8  # first sample byte after mdat header
    prefix = build(mdat_off)
    assert len(prefix) + 8 == mdat_off + 0 or True
    return prefix + box(b"mdat", mdat_body)


def encode_mp4_avc(frames, fps: int = 12, coding: str = "pcm") -> bytes:
    """MP4 with REAL decodable video: RGB frames → all-IDR baseline
    H.264 packed into the full box structure with the avcC decoder
    config. ``coding="pcm"`` (I_PCM macroblocks — lossless in the
    YCbCr domain) or ``coding="cavlc"`` (PREDICTED I_4x4/I_16x16
    macroblocks with CAVLC residuals — the ordinary all-intra shape,
    lossy; decode matches the encoder reconstruction bit-exactly).
    extract_video_samples + decode_avc_sample read either back."""
    from bento_ray.h264codec import (encode_avc_iframes,
                                     encode_avc_iframes_cavlc)

    frames = [np.asarray(f) for f in frames]
    if coding == "cavlc":
        avcc, samples, _ = encode_avc_iframes_cavlc(frames)
    else:
        avcc, samples = encode_avc_iframes(frames)
    h, w = frames[0].shape[:2]
    return encode_mp4_stub(width=w, height=h, fps=fps,
                           samples=samples, avcc=avcc)
