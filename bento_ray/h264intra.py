"""H.264 baseline intra macroblock layer: prediction, transforms,
(de)quantization and the I_4x4 / I_16x16 decode+encode paths
(ITU-T H.264 §8.3, §8.5, public spec).

Shared-reconstruction design: the encoder reconstructs every macroblock by
calling the SAME dequant + inverse-transform + prediction code the
decoder runs, so ``decode(encode(frame))`` is bit-exact against the
encoder's reconstruction by construction — the validation model the
sandbox allows (no external H.264 tooling; same caveat as
h264codec.py / h264cavlc.py).

Entropy coding is the sparse-subset CAVLC layer (h264cavlc):
``total_coeff <= 3`` per block, so every coeff_token context stays in
the confidently-transcribed tables.
"""

from __future__ import annotations

import numpy as np

from bento_ray.h264cavlc import (decode_residual_block,
                                 encode_residual_block,
                                 quantize_for_cavlc)
from bento_ray.mediaerrors import MediaDecodeError

# zigzag scan: scan position → raster index within the 4x4 block
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# 4x4 luma block decode order within a MB: (x4, y4) per luma4x4BlkIdx
BLK_ORDER = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1),
             (3, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2),
             (2, 3), (3, 3)]

# normAdjust4x4 (spec Table: LevelScale with flat weight lists).
# class 0: (0,0),(0,2),(2,0),(2,2); class 1: (1,1),(1,3),(3,1),(3,3);
# class 2: the rest.
_V = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
      (14, 23, 18), (16, 25, 20), (18, 29, 23)]
_CLASS = np.zeros(16, np.int64)
for _i in range(16):
    _r, _c = _i // 4, _i % 4
    if _r % 2 == 0 and _c % 2 == 0:
        _CLASS[_i] = 0
    elif _r % 2 == 1 and _c % 2 == 1:
        _CLASS[_i] = 1
    else:
        _CLASS[_i] = 2
# LevelScale4x4(m, i, j) with FLAT weight lists: weightScale(=16) ×
# normAdjust — the spec's << (qP/6 − 4) dequant form assumes the 16 is
# folded in here (with bare normAdjust the whole chain decodes 16×
# too small; caught by the flat-frame reconstruction probe)
LEVEL_SCALE = np.array([[16 * _V[m][_CLASS[i]] for i in range(16)]
                        for m in range(6)], np.int64)

# chroma qp mapping (Table 8-15) for qpi 30..51
_QPC_TAIL = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37,
             37, 38, 38, 38, 39, 39, 39, 39]

# coded_block_pattern me(v) mapping for Intra_4x4 (Table 9-4, intra
# column): codeNum → cbp. Shared by encode (inverted) and decode, so a
# transcription slip stays self-consistent (see module docstring).
CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45,
             46, 16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1,
             2, 4, 8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36,
             40, 38, 41]
CBP_INTRA_INV = {v: i for i, v in enumerate(CBP_INTRA)}


def chroma_qp(qp: int, offset: int = 0) -> int:
    qpi = max(0, min(51, qp + offset))
    return qpi if qpi < 30 else _QPC_TAIL[qpi - 30]


# --------------------------------------------------------------------------
# transforms (spec 8.5.12.2 / 8.5.10 / 8.5.11)

def idct4x4(d: np.ndarray) -> np.ndarray:
    """Core 4x4 inverse transform (spec 8.5.12.2): scaled coefficients
    in → residual out, INCLUDING the final (x+32)>>6 rounding."""
    d = d.astype(np.int64).reshape(4, 4)
    e = np.empty((4, 4), np.int64)
    # horizontal
    e[:, 0] = d[:, 0] + d[:, 2]
    e[:, 1] = d[:, 0] - d[:, 2]
    e[:, 2] = (d[:, 1] >> 1) - d[:, 3]
    e[:, 3] = d[:, 1] + (d[:, 3] >> 1)
    f = np.empty((4, 4), np.int64)
    f[:, 0] = e[:, 0] + e[:, 3]
    f[:, 1] = e[:, 1] + e[:, 2]
    f[:, 2] = e[:, 1] - e[:, 2]
    f[:, 3] = e[:, 0] - e[:, 3]
    g = np.empty((4, 4), np.int64)
    g[0] = f[0] + f[2]
    g[1] = f[0] - f[2]
    g[2] = (f[1] >> 1) - f[3]
    g[3] = f[1] + (f[3] >> 1)
    h = np.empty((4, 4), np.int64)
    h[0] = g[0] + g[3]
    h[1] = g[1] + g[2]
    h[2] = g[1] - g[2]
    h[3] = g[0] - g[3]
    return (h + 32) >> 6


def dequant4x4(coeffs: np.ndarray, qp: int, skip_dc: bool = False
               ) -> np.ndarray:
    """Spec 8.5.12.1 scaling (flat lists) of a 16-long raster-order
    coefficient array. ``skip_dc`` leaves position 0 untouched (the
    separately-scaled DC of Intra16x16/chroma blocks)."""
    c = coeffs.astype(np.int64)
    ls = LEVEL_SCALE[qp % 6].copy()
    out = np.empty(16, np.int64)
    if qp >= 24:
        out = (c * ls) << (qp // 6 - 4)
    else:
        out = (c * ls + (1 << (3 - qp // 6))) >> (4 - qp // 6)
    if skip_dc:
        out[0] = c[0]
    return out


def luma_dc_dequant(c: np.ndarray, qp: int) -> np.ndarray:
    """8.5.10: 4x4 inverse Hadamard + DC-specific scaling."""
    c = c.astype(np.int64).reshape(4, 4)
    hm = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                   [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)
    f = hm @ c @ hm
    ls0 = int(LEVEL_SCALE[qp % 6][0])
    if qp >= 36:
        dc = (f * ls0) << (qp // 6 - 6)
    else:
        dc = (f * ls0 + (1 << (5 - qp // 6))) >> (6 - qp // 6)
    return dc  # 4x4 of DC values, raster (y, x) over 4x4 luma blocks


def chroma_dc_dequant(c: np.ndarray, qpc: int) -> np.ndarray:
    """8.5.11: 2x2 Hadamard + scaling."""
    c = c.astype(np.int64).reshape(2, 2)
    hm = np.array([[1, 1], [1, -1]], np.int64)
    f = hm @ c @ hm
    ls0 = int(LEVEL_SCALE[qpc % 6][0])
    return ((f * ls0) << (qpc // 6)) >> 5


# forward (encoder-only; precision is free — recon uses the decode path)
_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], np.int64)
_MF0 = [13107, 11916, 10082, 9362, 8192, 7282]


def fdct4x4(res: np.ndarray) -> np.ndarray:
    return _CF @ res.astype(np.int64) @ _CF.T


def quant4x4(w: np.ndarray, qp: int) -> np.ndarray:
    """JM-style forward quant of a 4x4 core-transform output; raster
    16-long int array."""
    mf_row = np.array([(13107, 5243, 8066), (11916, 4660, 7490),
                       (10082, 4194, 6554), (9362, 3647, 5825),
                       (8192, 3355, 5243), (7282, 2893, 4559)][qp % 6],
                      np.int64)
    mf = mf_row[_CLASS]
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    w = w.reshape(16)
    lv = (np.abs(w) * mf + f) >> qbits
    return np.where(w < 0, -lv, lv).astype(np.int64)


def quant_dc(vals: np.ndarray, qp: int, n: int) -> np.ndarray:
    """Forward quant for Hadamard-transformed DC arrays (n=4 luma,
    with the spec's /2 folded in; n=2 chroma). Encoder-only — its
    precision does not affect decode exactness (the shared recon path
    dequantizes whatever levels come out)."""
    mf0 = _MF0[qp % 6]
    qbits = 16 + qp // 6
    f = (1 << qbits) // 3
    v = vals.astype(np.int64).reshape(-1)
    if n == 4:
        lv = (np.abs(v) * mf0 // 2 + f) >> qbits
    else:
        lv = (np.abs(v) * mf0 + f) >> qbits
    return np.where(v < 0, -lv, lv)


# --------------------------------------------------------------------------
# intra prediction (spec 8.3)

def _edge(plane: np.ndarray, px: int, py: int, n: int,
          avail_left: bool, avail_top: bool, avail_tl: bool,
          avail_tr: bool):
    """Gather boundary samples for an n×n block at (px, py):
    top row p[x,-1] x=0..2n-1 (with above-right substitution),
    left col p[-1,y] y=0..n-1, corner p[-1,-1]."""
    top = np.zeros(2 * n, np.int64)
    left = np.zeros(n, np.int64)
    corner = 0
    if avail_top:
        top[:n] = plane[py - 1, px:px + n]
        if avail_tr:
            top[n:] = plane[py - 1, px + n:px + 2 * n]
        else:
            top[n:] = plane[py - 1, px + n - 1]
    if avail_left:
        left[:] = plane[py:py + n, px - 1]
    if avail_tl:
        corner = int(plane[py - 1, px - 1])
    return top, left, corner


def pred4x4(plane, px, py, mode, avail_left, avail_top, avail_tl,
            avail_tr) -> np.ndarray:
    top, left, corner = _edge(plane, px, py, 4, avail_left, avail_top,
                              avail_tl, avail_tr)
    p = np.empty((4, 4), np.int64)
    if mode == 0:                         # vertical
        if not avail_top:
            raise MediaDecodeError("V pred without top")
        p[:] = top[:4]
    elif mode == 1:                       # horizontal
        if not avail_left:
            raise MediaDecodeError("H pred without left")
        p[:] = left[:, None]
    elif mode == 2:                       # DC
        if avail_left and avail_top:
            p[:] = (int(top[:4].sum()) + int(left.sum()) + 4) >> 3
        elif avail_top:
            p[:] = (int(top[:4].sum()) + 2) >> 2
        elif avail_left:
            p[:] = (int(left.sum()) + 2) >> 2
        else:
            p[:] = 128
    elif mode == 3:                       # diagonal down-left
        t = top
        for y in range(4):
            for x in range(4):
                if x + y == 6:
                    p[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    p[y, x] = (t[x + y] + 2 * t[x + y + 1]
                               + t[x + y + 2] + 2) >> 2
    elif mode == 4:                       # diagonal down-right
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (top[x - y - 2] + 2 * top[x - y - 1]
                               + top[x - y] + 2) >> 2
                elif x < y:
                    p[y, x] = (left[y - x - 2] + 2 * left[y - x - 1]
                               + left[y - x] + 2) >> 2
                else:
                    p[y, x] = (top[0] + 2 * corner + left[0] + 2) >> 2
    elif mode == 5:                       # vertical-right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (top[x - (y >> 1) - 1]
                               + top[x - (y >> 1)] + 1) >> 1
                elif z >= 0:
                    p[y, x] = (top[x - (y >> 1) - 2]
                               + 2 * top[x - (y >> 1) - 1]
                               + top[x - (y >> 1)] + 2) >> 2
                elif z == -1:
                    p[y, x] = (left[0] + 2 * corner + top[0] + 2) >> 2
                else:
                    p[y, x] = (left[y - 1] + 2 * left[y - 2]
                               + (left[y - 3] if y - 3 >= 0
                                  else corner) + 2) >> 2
    elif mode == 6:                       # horizontal-down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (left[y - (x >> 1) - 1]
                               + left[y - (x >> 1)] + 1) >> 1
                elif z >= 0:
                    p[y, x] = (left[y - (x >> 1) - 2]
                               + 2 * left[y - (x >> 1) - 1]
                               + left[y - (x >> 1)] + 2) >> 2
                elif z == -1:
                    p[y, x] = (left[0] + 2 * corner + top[0] + 2) >> 2
                else:
                    p[y, x] = (top[x - 1] + 2 * top[x - 2]
                               + (top[x - 3] if x - 3 >= 0
                                  else corner) + 2) >> 2
    elif mode == 7:                       # vertical-left
        for y in range(4):
            for x in range(4):
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (top[i] + top[i + 1] + 1) >> 1
                else:
                    p[y, x] = (top[i] + 2 * top[i + 1]
                               + top[i + 2] + 2) >> 2
    elif mode == 8:                       # horizontal-up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                i = y + (x >> 1)
                if z % 2 == 0 and z <= 4:
                    p[y, x] = (left[i] + left[i + 1] + 1) >> 1
                elif z in (1, 3):
                    p[y, x] = (left[i] + 2 * left[i + 1]
                               + left[i + 2] + 2) >> 2
                elif z == 5:
                    p[y, x] = (left[2] + 3 * left[3] + 2) >> 2
                else:
                    p[y, x] = left[3]
    else:
        raise MediaDecodeError(f"bad intra4x4 mode {mode}")
    return p


def pred16x16(plane, px, py, mode, avail_left, avail_top) -> np.ndarray:
    p = np.empty((16, 16), np.int64)
    if mode == 0:                         # vertical
        if not avail_top:
            raise MediaDecodeError("I16 V without top")
        p[:] = plane[py - 1, px:px + 16].astype(np.int64)
    elif mode == 1:                       # horizontal
        if not avail_left:
            raise MediaDecodeError("I16 H without left")
        p[:] = plane[py:py + 16, px - 1].astype(np.int64)[:, None]
    elif mode == 2:                       # DC
        s = 0
        cnt = 0
        if avail_top:
            s += int(plane[py - 1, px:px + 16].sum())
            cnt += 16
        if avail_left:
            s += int(plane[py:py + 16, px - 1].sum())
            cnt += 16
        if cnt == 32:
            p[:] = (s + 16) >> 5
        elif cnt == 16:
            p[:] = (s + 8) >> 4
        else:
            p[:] = 128
    elif mode == 3:                       # plane
        if not (avail_left and avail_top):
            raise MediaDecodeError("I16 plane needs both edges")
        t = plane[py - 1, px - 1:px + 16].astype(np.int64)  # [-1..15]
        lft = plane[py - 1:py + 16, px - 1].astype(np.int64)
        hh = sum((x + 1) * (t[1 + 8 + x] - t[1 + 6 - x])
                 for x in range(8))
        vv = sum((y + 1) * (lft[1 + 8 + y] - lft[1 + 6 - y])
                 for y in range(8))
        a = 16 * (int(t[16]) + int(lft[16]))
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        xs = np.arange(16)
        p[:] = np.clip((a + b * (xs[None, :] - 7)
                        + c * (xs[:, None] - 7) + 16) >> 5, 0, 255)
    else:
        raise MediaDecodeError(f"bad intra16 mode {mode}")
    return p


def pred_chroma(plane, px, py, mode, avail_left, avail_top) -> np.ndarray:
    p = np.empty((8, 8), np.int64)
    if mode == 0:                         # DC, per 4x4 sub-block
        for yo in (0, 4):
            for xo in (0, 4):
                # preference rules (8.3.4.1): corner blocks (0,0)/(4,4)
                # average both; (4,0) prefers top; (0,4) prefers left
                tsum = int(plane[py - 1, px + xo:px + xo + 4].sum()) \
                    if avail_top else None
                lsum = int(plane[py + yo:py + yo + 4, px - 1].sum()) \
                    if avail_left else None
                if (xo, yo) in ((0, 0), (4, 4)):
                    if tsum is not None and lsum is not None:
                        v = (tsum + lsum + 4) >> 3
                    elif tsum is not None:
                        v = (tsum + 2) >> 2
                    elif lsum is not None:
                        v = (lsum + 2) >> 2
                    else:
                        v = 128
                elif (xo, yo) == (4, 0):
                    if tsum is not None:
                        v = (tsum + 2) >> 2
                    elif lsum is not None:
                        v = (lsum + 2) >> 2
                    else:
                        v = 128
                else:                     # (0, 4)
                    if lsum is not None:
                        v = (lsum + 2) >> 2
                    elif tsum is not None:
                        v = (tsum + 2) >> 2
                    else:
                        v = 128
                p[yo:yo + 4, xo:xo + 4] = v
    elif mode == 1:                       # horizontal
        if not avail_left:
            raise MediaDecodeError("chroma H without left")
        p[:] = plane[py:py + 8, px - 1].astype(np.int64)[:, None]
    elif mode == 2:                       # vertical
        if not avail_top:
            raise MediaDecodeError("chroma V without top")
        p[:] = plane[py - 1, px:px + 8].astype(np.int64)
    elif mode == 3:                       # plane
        if not (avail_left and avail_top):
            raise MediaDecodeError("chroma plane needs both edges")
        t = plane[py - 1, px - 1:px + 8].astype(np.int64)
        lft = plane[py - 1:py + 8, px - 1].astype(np.int64)
        hh = sum((x + 1) * (t[1 + 4 + x] - t[1 + 2 - x])
                 for x in range(4))
        vv = sum((y + 1) * (lft[1 + 4 + y] - lft[1 + 2 - y])
                 for y in range(4))
        a = 16 * (int(t[8]) + int(lft[8]))
        b = (17 * hh + 16) >> 5
        c = (17 * vv + 16) >> 5
        xs = np.arange(8)
        p[:] = np.clip((a + b * (xs[None, :] - 3)
                        + c * (xs[:, None] - 3) + 16) >> 5, 0, 255)
    else:
        raise MediaDecodeError(f"bad chroma mode {mode}")
    return p


# --------------------------------------------------------------------------
# macroblock layer

def _unzigzag(scan: list[int], n_skip: int = 0) -> np.ndarray:
    """Scan-order coeffs → 16-long raster array; ``n_skip=1`` for
    15-coeff AC blocks (scan starts at zigzag position 1)."""
    out = np.zeros(16, np.int64)
    for k, v in enumerate(scan):
        out[ZIGZAG[k + n_skip]] = v
    return out


def _rezigzag(raster: np.ndarray, n_skip: int = 0) -> list[int]:
    return [int(raster[ZIGZAG[k + n_skip]])
            for k in range(16 - n_skip)]


class MBContext:
    """Reconstruction state shared by encoder and decoder: the three
    sample planes plus the per-4x4 bookkeeping CAVLC and prediction
    need (total_coeff grids for nC, intra-4x4 mode grid). Grid value
    -1 = not yet decoded (unavailable)."""

    def __init__(self, mb_w: int, mb_h: int):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
        self.cb = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        self.cr = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
        self.nz_y = np.full((mb_h * 4, mb_w * 4), -1, np.int16)
        self.nz_cb = np.full((mb_h * 2, mb_w * 2), -1, np.int16)
        self.nz_cr = np.full((mb_h * 2, mb_w * 2), -1, np.int16)
        # intra-4x4 pred mode per 4x4 block; -1 unavailable,
        # -2 decoded but not an I_4x4 MB (predicts as DC)
        self.mode4 = np.full((mb_h * 4, mb_w * 4), -1, np.int16)

    # -- nC (spec 9.2.1) ---------------------------------------------
    def nc(self, grid: np.ndarray, bx: int, by: int) -> int:
        na = int(grid[by, bx - 1]) if bx > 0 else -1
        nb = int(grid[by - 1, bx]) if by > 0 else -1
        if na >= 0 and nb >= 0:
            return (na + nb + 1) >> 1
        if na >= 0:
            return na
        if nb >= 0:
            return nb
        return 0

    def avail4(self, bx: int, by: int) -> tuple[bool, bool, bool, bool]:
        """(left, top, top-left, top-right) sample availability for
        the 4x4 luma block at grid (bx, by): available = inside the
        picture AND already reconstructed (z-scan within the MB)."""
        g = self.nz_y
        al = bx > 0 and g[by, bx - 1] >= 0
        at = by > 0 and g[by - 1, bx] >= 0
        atl = bx > 0 and by > 0 and g[by - 1, bx - 1] >= 0
        atr = by > 0 and bx + 1 < g.shape[1] and g[by - 1, bx + 1] >= 0
        return al, at, atl, atr

    def pred_mode4(self, bx: int, by: int) -> int:
        """predIntra4x4PredMode (8.3.1.1): min of the left/above
        blocks' modes, DC (2) when a neighbor is unavailable or not
        I_4x4."""
        ma = int(self.mode4[by, bx - 1]) if bx > 0 else -1
        mb = int(self.mode4[by - 1, bx]) if by > 0 else -1
        if ma < 0:
            ma = 2
        if mb < 0:
            mb = 2
        return min(ma, mb)


def _recon_block(plane, px, py, pred, d_raster) -> int:
    res = idct4x4(d_raster)
    plane[py:py + 4, px:px + 4] = np.clip(pred + res, 0, 255) \
        .astype(np.uint8)
    return 0


def _chroma_planes(ctx, which: int):
    return (ctx.cb, ctx.nz_cb) if which == 0 else (ctx.cr, ctx.nz_cr)


def _chroma_residual_syntax(r, ctx, mx, my, cbp_chroma):
    """Parse the chroma residual in spec 7.3.5.3 order: both DC blocks
    (cb, cr), then all AC blocks (cb×4, cr×4). Returns
    (dc[2][4] scan-order, ac[2][4] scan-order-lists, ac_counts)."""
    dcs = [[0] * 4, [0] * 4]
    acs = [[None] * 4 for _ in range(2)]
    counts = [[0] * 4 for _ in range(2)]
    if cbp_chroma & 3:
        for which in range(2):
            dcs[which] = decode_residual_block(r, -1, 4)
    if cbp_chroma & 2:
        for which in range(2):
            _, grid = _chroma_planes(ctx, which)
            for blk in range(4):
                bx, by = mx * 2 + blk % 2, my * 2 + blk // 2
                nc = ctx.nc(grid, bx, by)
                scan = decode_residual_block(r, nc, 15)
                acs[which][blk] = scan
                counts[which][blk] = sum(1 for v in scan if v)
                grid[by, bx] = counts[which][blk]
    # blocks without parsed AC still need grid entries for later nC
    for which in range(2):
        _, grid = _chroma_planes(ctx, which)
        for blk in range(4):
            bx, by = mx * 2 + blk % 2, my * 2 + blk // 2
            if grid[by, bx] < 0:
                grid[by, bx] = 0
    return dcs, acs


def _recon_chroma(ctx, mx, my, chroma_mode, dcs, acs, qpc):
    for which in range(2):
        plane, _ = _chroma_planes(ctx, which)
        px, py = mx * 8, my * 8
        pred = pred_chroma(plane, px, py, chroma_mode,
                           avail_left=mx > 0, avail_top=my > 0)
        dc_vals = chroma_dc_dequant(np.array(dcs[which]), qpc)
        for blk in range(4):
            xo, yo = (blk % 2) * 4, (blk // 2) * 4
            scan = acs[which][blk]
            raster = _unzigzag(scan, 1) if scan is not None \
                else np.zeros(16, np.int64)
            d = dequant4x4(raster, qpc, skip_dc=True)
            d[0] = int(dc_vals[blk // 2, blk % 2])
            res = idct4x4(d)
            blkpred = pred[yo:yo + 4, xo:xo + 4]
            plane[py + yo:py + yo + 4, px + xo:px + xo + 4] = \
                np.clip(blkpred + res, 0, 255).astype(np.uint8)


def decode_macroblock(r, ctx: MBContext, mx: int, my: int,
                      mb_type: int, qp: int) -> int:
    """Decode one I_4x4 (mb_type 0) or I_16x16 (1..24) macroblock into
    ``ctx``; returns the (possibly mb_qp_delta-updated) slice qp."""
    if mb_type == 0:
        modes = []
        for blk in range(16):
            x4, y4 = BLK_ORDER[blk]
            bx, by = mx * 4 + x4, my * 4 + y4
            pm = ctx.pred_mode4(bx, by)
            if r.u(1):                    # prev_intra4x4_pred_mode_flag
                mode = pm
            else:
                rem = r.u(3)
                mode = rem if rem < pm else rem + 1
            modes.append(mode)
            ctx.mode4[by, bx] = mode      # neighbors see final modes
        chroma_mode = r.ue()
        cbp_code = r.ue()
        if cbp_code >= len(CBP_INTRA):
            raise MediaDecodeError("coded_block_pattern out of range")
        cbp = CBP_INTRA[cbp_code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        if cbp:
            qp = (qp + r.se() + 52) % 52
        for blk in range(16):
            x4, y4 = BLK_ORDER[blk]
            bx, by = mx * 4 + x4, my * 4 + y4
            blk8 = (y4 // 2) * 2 + (x4 // 2)
            if cbp_luma & (1 << blk8):
                nc = ctx.nc(ctx.nz_y, bx, by)
                scan = decode_residual_block(r, nc, 16)
                raster = _unzigzag(scan)
                count = sum(1 for v in scan if v)
            else:
                raster = np.zeros(16, np.int64)
                count = 0
            al, at, atl, atr = ctx.avail4(bx, by)
            pred = pred4x4(ctx.y, bx * 4, by * 4, modes[blk],
                           al, at, atl, atr)
            _recon_block(ctx.y, bx * 4, by * 4, pred,
                         dequant4x4(raster, qp))
            ctx.nz_y[by, bx] = count
        dcs, acs = _chroma_residual_syntax(r, ctx, mx, my, cbp_chroma)
        _recon_chroma(ctx, mx, my, chroma_mode, dcs, acs,
                      chroma_qp(qp))
        return qp

    # I_16x16
    code = mb_type - 1
    pm16 = code % 4
    cbp_chroma = (code // 4) % 3
    cbp_luma = 15 if code >= 12 else 0
    chroma_mode = r.ue()
    qp = (qp + r.se() + 52) % 52
    # luma DC block: nC from block (0,0)'s neighbors
    bx0, by0 = mx * 4, my * 4
    dc_scan = decode_residual_block(r, ctx.nc(ctx.nz_y, bx0, by0), 16)
    dc_vals = luma_dc_dequant(_unzigzag(dc_scan), qp)
    pred = pred16x16(ctx.y, mx * 16, my * 16, pm16,
                     avail_left=mx > 0, avail_top=my > 0)
    ac_scans: list = []
    for blk in range(16):
        x4, y4 = BLK_ORDER[blk]
        bx, by = mx * 4 + x4, my * 4 + y4
        if cbp_luma:
            nc = ctx.nc(ctx.nz_y, bx, by)
            scan = decode_residual_block(r, nc, 15)
            ctx.nz_y[by, bx] = sum(1 for v in scan if v)
        else:
            scan = None
            ctx.nz_y[by, bx] = 0
        ac_scans.append(scan)
        ctx.mode4[by, bx] = -2
        # reconstruct immediately: I_16x16 prediction uses only
        # OUTSIDE-MB samples, already final
        raster = _unzigzag(scan, 1) if scan is not None \
            else np.zeros(16, np.int64)
        d = dequant4x4(raster, qp, skip_dc=True)
        d[0] = int(dc_vals[y4, x4])
        blkpred = pred[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4]
        res = idct4x4(d)
        ctx.y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
            np.clip(blkpred + res, 0, 255).astype(np.uint8)
    dcs, acs = _chroma_residual_syntax(r, ctx, mx, my, cbp_chroma)
    _recon_chroma(ctx, mx, my, chroma_mode, dcs, acs, chroma_qp(qp))
    return qp


# --------------------------------------------------------------------------
# encoder macroblock (fixture generator): deterministic mode variety,
# sparse-subset residuals, reconstruction via the decode-path kernels

def _enc_block_levels(src_blk, pred, qp, max_coeff=16, skip_dc=False):
    """residual → forward transform → quant → sparse clamp; returns
    (scan-order levels list, raster d for recon is NOT built here)."""
    res = src_blk.astype(np.int64) - pred
    w = fdct4x4(res)
    q = quant4x4(w, qp)
    scan = _rezigzag(q, 1 if skip_dc else 0)
    return quantize_for_cavlc(scan)


def encode_macroblock(w, ctx: MBContext, mx: int, my: int,
                      src_y, src_cb, src_cr, qp: int,
                      variant: int, allow_pcm: bool = False) -> None:
    """Emit one intra macroblock (syntax via ``w``) and reconstruct it
    into ``ctx`` with the decoder's own kernels. ``variant`` steers
    deterministic mode variety across the picture; ``allow_pcm``
    additionally mixes I_PCM macroblocks in (what a real encoder does
    for noisy content) — exercising the decoder's nC=16 PCM-neighbor
    bookkeeping against predicted neighbors."""
    px, py = mx * 16, my * 16
    al_mb, at_mb = mx > 0, my > 0
    if allow_pcm and variant % 5 == 4:
        w.ue(25)                          # mb_type I_PCM
        w.align_zero()
        yblk = src_y[py:py + 16, px:px + 16]
        cbblk = src_cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
        crblk = src_cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
        w.raw(np.ascontiguousarray(yblk).tobytes())
        w.raw(np.ascontiguousarray(cbblk).tobytes())
        w.raw(np.ascontiguousarray(crblk).tobytes())
        ctx.y[py:py + 16, px:px + 16] = yblk
        ctx.cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cbblk
        ctx.cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = crblk
        ctx.nz_y[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 16
        ctx.nz_cb[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
        ctx.nz_cr[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
        ctx.mode4[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -2
        return
    use_i4 = variant % 3 == 1

    # chroma mode: cycle through the AVAILABLE set
    cmodes = [0]
    if al_mb:
        cmodes.append(1)
    if at_mb:
        cmodes.append(2)
    if al_mb and at_mb:
        cmodes.append(3)
    chroma_mode = cmodes[variant % len(cmodes)]

    sy = src_y[py:py + 16, px:px + 16]
    if use_i4:
        _encode_i4x4(w, ctx, mx, my, sy, qp, chroma_mode, variant,
                     src_cb, src_cr)
    else:
        _encode_i16(w, ctx, mx, my, sy, qp, chroma_mode, variant,
                    src_cb, src_cr)


def _chroma_levels(ctx, mx, my, chroma_mode, src_cb, src_cr, qpc):
    """Choose chroma residual levels for both planes; returns
    (cbp_chroma, dcs, acs) in the decoder's representation."""
    dcs = [[0] * 4, [0] * 4]
    acs = [[None] * 4 for _ in range(2)]
    any_dc = any_ac = False
    for which, src in ((0, src_cb), (1, src_cr)):
        plane, _ = _chroma_planes(ctx, which)
        px, py = mx * 8, my * 8
        pred = pred_chroma(plane, px, py, chroma_mode,
                           avail_left=mx > 0, avail_top=my > 0)
        # forward: per 4x4 block core transform; DC → 2x2 hadamard
        wdc = np.zeros((2, 2), np.int64)
        ws = []
        for blk in range(4):
            xo, yo = (blk % 2) * 4, (blk // 2) * 4
            res = src[py + yo:py + yo + 4, px + xo:px + xo + 4] \
                .astype(np.int64) - pred[yo:yo + 4, xo:xo + 4]
            wt = fdct4x4(res)
            ws.append(wt)
            wdc[blk // 2, blk % 2] = wt[0, 0]
        hm = np.array([[1, 1], [1, -1]], np.int64)
        f = hm @ wdc @ hm
        dcq = quant_dc(f, qpc, 2)
        dc_scan = quantize_for_cavlc([int(v) for v in dcq])
        dcs[which] = dc_scan
        if any(dc_scan):
            any_dc = True
        for blk in range(4):
            q = quant4x4(ws[blk], qpc)
            scan = quantize_for_cavlc(_rezigzag(q, 1))
            acs[which][blk] = scan
            if any(scan):
                any_ac = True
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
    if cbp_chroma == 0:
        acs = [[None] * 4 for _ in range(2)]
    return cbp_chroma, dcs, acs


def _emit_chroma(w, ctx, mx, my, cbp_chroma, dcs, acs):
    if cbp_chroma & 3:
        for which in range(2):
            encode_residual_block(w, dcs[which], -1)
    if cbp_chroma & 2:
        for which in range(2):
            _, grid = _chroma_planes(ctx, which)
            for blk in range(4):
                bx, by = mx * 2 + blk % 2, my * 2 + blk // 2
                nc = ctx.nc(grid, bx, by)
                encode_residual_block(w, acs[which][blk], nc)
                grid[by, bx] = sum(1 for v in acs[which][blk] if v)
    for which in range(2):
        _, grid = _chroma_planes(ctx, which)
        for blk in range(4):
            bx, by = mx * 2 + blk % 2, my * 2 + blk // 2
            if grid[by, bx] < 0:
                grid[by, bx] = 0


def _encode_i16(w, ctx, mx, my, sy, qp, chroma_mode, variant,
                src_cb, src_cr):
    al_mb, at_mb = mx > 0, my > 0
    pmodes = [2]
    if at_mb:
        pmodes.append(0)
    if al_mb:
        pmodes.append(1)
    if al_mb and at_mb:
        pmodes.append(3)
    pm16 = pmodes[variant % len(pmodes)]
    pred = pred16x16(ctx.y, mx * 16, my * 16, pm16,
                     avail_left=al_mb, avail_top=at_mb)

    # forward transform all 16 blocks; separate DC plane
    wdc = np.zeros((4, 4), np.int64)
    ac_scans = []
    for blk in range(16):
        x4, y4 = BLK_ORDER[blk]
        res = sy[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4].astype(np.int64) \
            - pred[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4]
        wt = fdct4x4(res)
        wdc[y4, x4] = wt[0, 0]
        q = quant4x4(wt, qp)
        ac_scans.append(quantize_for_cavlc(_rezigzag(q, 1)))
    hm = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                   [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)
    f = hm @ wdc @ hm
    dcq = quant_dc(f, qp, 4)
    dc_raster = np.zeros(16, np.int64)
    dc_raster[:] = dcq.reshape(16)
    dc_scan = quantize_for_cavlc(_rezigzag(dc_raster))

    cbp_luma = 15 if any(any(s) for s in ac_scans) else 0
    if not cbp_luma:
        ac_scans = [None] * 16
    qpc = chroma_qp(qp)
    cbp_chroma, dcs, acs = _chroma_levels(ctx, mx, my, chroma_mode,
                                          src_cb, src_cr, qpc)
    code = pm16 + 4 * cbp_chroma + (12 if cbp_luma else 0)
    w.ue(code + 1)                        # mb_type
    w.ue(chroma_mode)
    w.se(0)                               # mb_qp_delta
    bx0, by0 = mx * 4, my * 4
    encode_residual_block(w, dc_scan, ctx.nc(ctx.nz_y, bx0, by0))

    dc_vals = luma_dc_dequant(_unzigzag(dc_scan), qp)
    pred_full = pred
    for blk in range(16):
        x4, y4 = BLK_ORDER[blk]
        bx, by = mx * 4 + x4, my * 4 + y4
        if cbp_luma:
            nc = ctx.nc(ctx.nz_y, bx, by)
            encode_residual_block(w, ac_scans[blk], nc)
            ctx.nz_y[by, bx] = sum(1 for v in ac_scans[blk] if v)
        else:
            ctx.nz_y[by, bx] = 0
        ctx.mode4[by, bx] = -2
        raster = _unzigzag(ac_scans[blk], 1) if ac_scans[blk] \
            else np.zeros(16, np.int64)
        d = dequant4x4(raster, qp, skip_dc=True)
        d[0] = int(dc_vals[y4, x4])
        res = idct4x4(d)
        blkpred = pred_full[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4]
        ctx.y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
            np.clip(blkpred + res, 0, 255).astype(np.uint8)
    _emit_chroma(w, ctx, mx, my, cbp_chroma, dcs, acs)
    _recon_chroma(ctx, mx, my, chroma_mode, dcs, acs, qpc)


def _encode_i4x4(w, ctx, mx, my, sy, qp, chroma_mode, variant,
                 src_cb, src_cr):
    # pass 1: choose modes + residuals block by block (reconstructing
    # as we go — later blocks predict from earlier recon), collecting
    # syntax elements; emission happens in spec order afterwards.
    mode_bits = []                        # (prev_flag, rem or None)
    blk_scans: list = []
    modes = []
    recon_snapshot = None
    for blk in range(16):
        x4, y4 = BLK_ORDER[blk]
        bx, by = mx * 4 + x4, my * 4 + y4
        al, at, atl, atr = ctx.avail4(bx, by)
        cand = [2]
        if at:
            cand += [0, 3, 7]
        if al:
            cand += [1, 8]
        if al and at and atl:
            cand += [4, 5, 6]
        mode = cand[(variant + blk) % len(cand)]
        pm = ctx.pred_mode4(bx, by)
        if mode == pm:
            mode_bits.append((1, None))
        else:
            rem = mode if mode < pm else mode - 1
            mode_bits.append((0, rem))
        modes.append(mode)
        ctx.mode4[by, bx] = mode
        pred = pred4x4(ctx.y, bx * 4, by * 4, mode, al, at, atl, atr)
        scan = _enc_block_levels(sy[y4 * 4:y4 * 4 + 4,
                                    x4 * 4:x4 * 4 + 4], pred, qp)
        blk_scans.append(scan)
        # tentative recon with the residual as chosen (cbp grouping
        # below may zero blocks whose whole 8x8 group is empty — those
        # blocks have zero scans already, so recon is final)
        raster = _unzigzag(scan)
        _recon_block(ctx.y, bx * 4, by * 4, pred,
                     dequant4x4(raster, qp))
        ctx.nz_y[by, bx] = sum(1 for v in scan if v)

    cbp_luma = 0
    for blk in range(16):
        if any(blk_scans[blk]):
            x4, y4 = BLK_ORDER[blk]
            cbp_luma |= 1 << ((y4 // 2) * 2 + (x4 // 2))
    qpc = chroma_qp(qp)
    cbp_chroma, dcs, acs = _chroma_levels(ctx, mx, my, chroma_mode,
                                          src_cb, src_cr, qpc)
    cbp = cbp_luma | (cbp_chroma << 4)

    w.ue(0)                               # mb_type I_4x4 (I slice)
    for prev, rem in mode_bits:
        w.u(prev, 1)
        if not prev:
            w.u(rem, 3)
    w.ue(chroma_mode)
    w.ue(CBP_INTRA_INV[cbp])
    if cbp:
        w.se(0)                           # mb_qp_delta
    for blk in range(16):
        x4, y4 = BLK_ORDER[blk]
        bx, by = mx * 4 + x4, my * 4 + y4
        blk8 = (y4 // 2) * 2 + (x4 // 2)
        if cbp_luma & (1 << blk8):
            # nC must be computed exactly as the decoder does — from
            # the grid as it stood BEFORE this block: rebuild by
            # temporarily clearing later entries? The grid was fully
            # populated in pass 1, and nc() only looks LEFT and UP —
            # blocks decoded before this one in scan order — so the
            # values it reads are already final. Left/up neighbors
            # always precede in raster... NOT in z-scan: block (0,1)
            # (idx 2) reads (1,0)? no — up is (0,0). Left/up of any
            # block precede it in BLK_ORDER z-scan, so grid state
            # matches the decoder's.
            nc = ctx.nc(ctx.nz_y, bx, by)
            encode_residual_block(w, blk_scans[blk], nc)
    _emit_chroma(w, ctx, mx, my, cbp_chroma, dcs, acs)
    _recon_chroma(ctx, mx, my, chroma_mode, dcs, acs, qpc)
