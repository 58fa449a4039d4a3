"""CAVLC residual entropy layer for the H.264 baseline intra codec
(ITU-T H.264 §9.2, public spec).

Table-driven: ``coeff_token`` (Table 9-5), ``total_zeros`` (9-7/9-9a)
and ``run_before`` (9-10) are bitstring↔value maps shared by encode and
decode, so a transcription slip cannot desynchronize this codec against
itself. Import-time self-checks prove every table prefix-free.

Honesty note (same caveat as h264codec.py's I_PCM layer): the sandbox
has no external H.264 encoder or conformance streams, so validation is
structural + encode↔decode round-trip. The ``4 <= nC < 8`` coeff_token
context could not be transcribed with confidence — the DECODER refuses
it loudly instead of risking silent desync, and the ENCODER keeps its
own streams out of that context by capping every block at
``total_coeff <= 3`` (then ``nC = (nA+nB+1)>>1 <= 3`` everywhere) and
``|level| <= 7`` (no level_prefix escape codes). Sparse-residual intra
streams are fully legal H.264.

Block syntax (9.2.1-9.2.4): coeff_token → trailing-one signs →
level_prefix/level_suffix with adaptive suffixLength → total_zeros →
run_before. ``nC`` context selection (9.2.1) is the caller's job.
"""

from __future__ import annotations

from bento_ray.mediaerrors import MediaDecodeError

# encoder-side guarantees (see module docstring)
ENC_MAX_COEFF = 3
# levels use the full escape ladder (level_prefix 14/15) — pure
# arithmetic, no table risk; the bound keeps level_prefix <= 15
ENC_MAX_LEVEL = 1024

# --------------------------------------------------------------------------
# Table 9-5: coeff_token. (trailing_ones, total_coeff) → bitstring.
# Rows transcribed only as deep as confident recall of the public
# table allows (NC0: tc<=10, NC2: tc<=8) — the import-time prefix
# check rejected deeper transcriptions. Denser blocks than these are
# outside the documented sparse-intra subset; the decoder raises a
# clean CAVLC-desync MediaDecodeError instead of guessing.

_CT_NC0 = {  # 0 <= nC < 2
    (0, 0): "1",
    (0, 1): "000101", (1, 1): "01",
    (0, 2): "00000111", (1, 2): "000100", (2, 2): "001",
    (0, 3): "000000111", (1, 3): "00000110", (2, 3): "0000101",
    (3, 3): "00011",
    (0, 4): "0000000111", (1, 4): "000000110", (2, 4): "00000101",
    (3, 4): "000011",
    (0, 5): "00000000111", (1, 5): "0000000110", (2, 5): "000000101",
    (3, 5): "0000100",
    (0, 6): "0000000001111", (1, 6): "00000000110", (2, 6): "0000000101",
    (3, 6): "00000100",
    (0, 7): "0000000001011", (1, 7): "0000000001110",
    (2, 7): "00000000101", (3, 7): "000000100",
    (0, 8): "0000000001000", (1, 8): "0000000001010",
    (2, 8): "0000000001101", (3, 8): "0000000100",
    (0, 9): "00000000001111", (1, 9): "00000000001110",
    (2, 9): "0000000001001", (3, 9): "00000000100",
    (0, 10): "00000000001011", (1, 10): "00000000001010",
    (2, 10): "00000000001101", (3, 10): "0000000001100",
}

_CT_NC2 = {  # 2 <= nC < 4
    (0, 0): "11",
    (0, 1): "001011", (1, 1): "10",
    (0, 2): "000111", (1, 2): "00111", (2, 2): "011",
    (0, 3): "0000111", (1, 3): "001010", (2, 3): "001001", (3, 3): "0101",
    (0, 4): "00000111", (1, 4): "000110", (2, 4): "000101", (3, 4): "0100",
    (0, 5): "00000100", (1, 5): "0000110", (2, 5): "0000101",
    (3, 5): "00110",
    (0, 6): "000000111", (1, 6): "00000110", (2, 6): "00000101",
    (3, 6): "001000",
    (0, 7): "00000001111", (1, 7): "000000110", (2, 7): "000000101",
    (3, 7): "000100",
    (0, 8): "00000001011", (1, 8): "00000001110", (2, 8): "00000001101",
    (3, 8): "0000100",
}

_CT_CDC = {  # chroma DC (nC == -1), total_coeff <= 4
    (0, 0): "01",
    (0, 1): "000111", (1, 1): "1",
    (0, 2): "000100", (1, 2): "000110", (2, 2): "001",
    (0, 3): "000011", (1, 3): "0000011", (2, 3): "0000010", (3, 3): "000101",
    (0, 4): "000010", (1, 4): "00000011", (2, 4): "00000010",
    (3, 4): "0000000",
}

# Table 9-7 — total_zeros for 4x4 blocks, by total_coeff 1..15.
_TZ_4x4 = {
    1: {"1": 0, "011": 1, "010": 2, "0011": 3, "0010": 4, "00011": 5,
        "00010": 6, "000011": 7, "000010": 8, "0000011": 9,
        "0000010": 10, "00000011": 11, "00000010": 12, "000000011": 13,
        "000000010": 14, "000000001": 15},
    2: {"111": 0, "110": 1, "101": 2, "100": 3, "011": 4, "0101": 5,
        "0100": 6, "0011": 7, "0010": 8, "00011": 9, "00010": 10,
        "000011": 11, "000010": 12, "000001": 13, "000000": 14},
    3: {"0101": 0, "111": 1, "110": 2, "101": 3, "0100": 4, "0011": 5,
        "100": 6, "011": 7, "0010": 8, "00011": 9, "00010": 10,
        "000001": 11, "00001": 12, "000000": 13},
    4: {"00011": 0, "111": 1, "0101": 2, "0100": 3, "110": 4, "101": 5,
        "100": 6, "0011": 7, "011": 8, "0010": 9, "00010": 10,
        "00001": 11, "00000": 12},
    5: {"0101": 0, "0100": 1, "0011": 2, "111": 3, "110": 4, "101": 5,
        "100": 6, "011": 7, "0010": 8, "00001": 9, "0001": 10,
        "00000": 11},
    6: {"000001": 0, "00001": 1, "111": 2, "110": 3, "101": 4, "100": 5,
        "011": 6, "010": 7, "0001": 8, "001": 9, "000000": 10},
    7: {"000001": 0, "00001": 1, "101": 2, "100": 3, "011": 4, "11": 5,
        "010": 6, "0001": 7, "001": 8, "000000": 9},
    8: {"000001": 0, "0001": 1, "00001": 2, "011": 3, "11": 4, "10": 5,
        "010": 6, "001": 7, "000000": 8},
    9: {"000001": 0, "000000": 1, "0001": 2, "11": 3, "10": 4, "001": 5,
        "01": 6, "00001": 7},
    10: {"00001": 0, "00000": 1, "001": 2, "11": 3, "10": 4, "01": 5,
         "0001": 6},
    11: {"0000": 0, "0001": 1, "001": 2, "010": 3, "1": 4, "011": 5},
    12: {"0000": 0, "0001": 1, "01": 2, "1": 3, "001": 4},
    13: {"000": 0, "001": 1, "1": 2, "01": 3},
    14: {"00": 0, "01": 1, "1": 2},
    15: {"0": 0, "1": 1},
}

# Table 9-9(a) — total_zeros for chroma DC (2x2, maxNumCoeff 4)
_TZ_CDC = {
    1: {"1": 0, "01": 1, "001": 2, "000": 3},
    2: {"1": 0, "01": 1, "00": 2},
    3: {"1": 0, "0": 1},
}

# Table 9-10 — run_before, by min(zerosLeft, 7); row 7 extends unary
# ("0001" → 7, "00001" → 8, …) in code.
_RUN_BEFORE = {
    1: {"1": 0, "0": 1},
    2: {"1": 0, "01": 1, "00": 2},
    3: {"11": 0, "10": 1, "01": 2, "00": 3},
    4: {"11": 0, "10": 1, "01": 2, "001": 3, "000": 4},
    5: {"11": 0, "10": 1, "011": 2, "010": 3, "001": 4, "000": 5},
    6: {"11": 0, "000": 1, "001": 2, "011": 3, "010": 4, "101": 5,
        "100": 6},
    7: {"111": 0, "110": 1, "101": 2, "100": 3, "011": 4, "010": 5,
        "001": 6},
}


def _check_prefix_free(name: str, codes) -> None:
    codes = sorted(codes)
    for a, b in zip(codes, codes[1:]):
        if b.startswith(a):
            raise AssertionError(f"{name}: {a!r} is a prefix of {b!r}")


for _n, _t in (("CT_NC0", _CT_NC0), ("CT_NC2", _CT_NC2),
               ("CT_CDC", _CT_CDC)):
    _check_prefix_free(_n, _t.values())
for _n, _t in (("TZ_4x4", _TZ_4x4), ("TZ_CDC", _TZ_CDC),
               ("RUN_BEFORE", _RUN_BEFORE)):
    for _k, _sub in _t.items():
        _check_prefix_free(f"{_n}[{_k}]", _sub.keys())

# decode direction: bits → value
_CT_DEC = {0: {v: k for k, v in _CT_NC0.items()},
           2: {v: k for k, v in _CT_NC2.items()},
           -1: {v: k for k, v in _CT_CDC.items()}}
_CT_ENC = {0: _CT_NC0, 2: _CT_NC2, -1: _CT_CDC}

# encode direction: value → bits, inverted once at import — the
# per-block encode loop used to rebuild these dicts per residual block
_TZ_4x4_ENC = {tc: {v: k for k, v in t.items()}
               for tc, t in _TZ_4x4.items()}
_TZ_CDC_ENC = {tc: {v: k for k, v in t.items()}
               for tc, t in _TZ_CDC.items()}
_RUN_BEFORE_ENC = {zl: {v: k for k, v in t.items()}
                   for zl, t in _RUN_BEFORE.items()}


def _ct_key(nC: int) -> int:
    if nC == -1:
        return -1
    if 0 <= nC < 2:
        return 0
    if 2 <= nC < 4:
        return 2
    if 4 <= nC < 8:
        raise MediaDecodeError(
            "coeff_token context 4<=nC<8 unsupported (table "
            "transcription not validated; this decoder's own encoder "
            "never produces it — see h264cavlc module docstring)")
    return 8  # 6-bit FLC


def _read_vlc(r, table: dict, what: str):
    code = ""
    for _ in range(32):
        code += "01"[r.u(1)]
        if code in table:
            return table[code]
    raise MediaDecodeError(f"CAVLC desync reading {what} ({code[:16]}…)")


def _write_bits(w, bits: str) -> None:
    for b in bits:
        w.u(b == "1", 1)


# --------------------------------------------------------------------------
# block decode (spec 9.2)

def decode_residual_block(r, nC: int, max_coeff: int) -> list[int]:
    """One CAVLC residual block → ``max_coeff`` coefficients in
    decoding (zigzag-scan) order. ``r`` needs only ``u(n)``."""
    key = _ct_key(nC)
    if key == 8:
        flc = r.u(6)
        if flc == 0b000011:
            t1s, tc = 0, 0
        else:
            tc, t1s = (flc >> 2) + 1, flc & 3
    else:
        t1s, tc = _read_vlc(r, _CT_DEC[key], "coeff_token")
    if tc == 0:
        return [0] * max_coeff
    if tc > max_coeff:
        raise MediaDecodeError("total_coeff exceeds block size")

    levels: list[int] = []
    for _ in range(t1s):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (tc > 10 and t1s < 3) else 0
    for i in range(tc - t1s):
        lp = 0
        while r.u(1) == 0:
            lp += 1
            if lp > 32:
                raise MediaDecodeError("level_prefix runaway")
        suffix_size = suffix_len
        if lp == 14 and suffix_len == 0:
            suffix_size = 4
        elif lp >= 15:
            suffix_size = lp - 3
        code = min(15, lp) << suffix_len
        if suffix_size:
            code += r.u(suffix_size)
        if lp >= 15 and suffix_len == 0:
            code += 15
        if lp >= 16:
            code += (1 << (lp - 3)) - 4096
        if i == 0 and t1s < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1

    if tc < max_coeff:
        tz_table = _TZ_CDC if nC == -1 else _TZ_4x4
        total_zeros = _read_vlc(r, tz_table[tc], "total_zeros")
    else:
        total_zeros = 0

    out = [0] * max_coeff
    zeros_left = total_zeros
    pos = tc + total_zeros - 1
    for i in range(tc):
        out[pos] = levels[i]
        if i < tc - 1:
            if zeros_left > 6:
                # 3-bit row ("111"→0 … "001"→6) + unary extension:
                # "000" then N zeros then 1 → run 7+N
                v = r.u(3)
                if v:
                    run = 7 - v
                else:
                    run = 7
                    while r.u(1) == 0:
                        run += 1
                        if run > 15:
                            raise MediaDecodeError("run_before runaway")
            elif zeros_left > 0:
                run = _read_vlc(r, _RUN_BEFORE[zeros_left],
                                "run_before")
            else:
                run = 0
            if run > zeros_left:
                raise MediaDecodeError("run_before exceeds zeros left")
            zeros_left -= run
            pos -= run + 1
    return out


# --------------------------------------------------------------------------
# block encode — restricted to the documented sparse subset

def quantize_for_cavlc(coeffs: list[int]) -> list[int]:
    """Clamp a quantized-coefficient list into this encoder's CAVLC
    subset: keep only the ``ENC_MAX_COEFF`` largest-magnitude
    coefficients (ties → lowest frequency wins) and clip levels to
    ±``ENC_MAX_LEVEL``. The codec's fixtures reconstruct with exactly
    these clamped levels, so encode→decode stays bit-exact."""
    idx = sorted(range(len(coeffs)), key=lambda i: (-abs(coeffs[i]), i))
    keep = set(i for i in idx[:ENC_MAX_COEFF] if coeffs[i])
    return [max(-ENC_MAX_LEVEL, min(ENC_MAX_LEVEL, c))
            if i in keep else 0
            for i, c in enumerate(coeffs)]


def encode_residual_block(w, coeffs: list[int], nC: int) -> None:
    """Inverse of decode_residual_block for the sparse subset
    (``quantize_for_cavlc`` output). ``w`` needs only ``u(v, n)``."""
    max_coeff = len(coeffs)
    nz = [(i, c) for i, c in enumerate(coeffs) if c]
    tc = len(nz)
    if tc > ENC_MAX_COEFF:
        raise ValueError("encoder subset: total_coeff must be <= "
                         f"{ENC_MAX_COEFF}")
    # trailing ones: run of |level|==1 at the high-frequency end
    t1s = 0
    for i in range(tc - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1s < 3:
            t1s += 1
        else:
            break
    key = _ct_key(nC)
    if key == 8:
        w.u(0b000011 if tc == 0 else ((tc - 1) << 2) | t1s, 6)
    else:
        table = _CT_ENC[key]
        if (t1s, tc) not in table:
            raise ValueError(f"no coeff_token for t1s={t1s} tc={tc}")
        _write_bits(w, table[(t1s, tc)])
    if tc == 0:
        return

    # levels, highest frequency first
    levels = [c for _, c in reversed(nz)]
    for i in range(t1s):
        w.u(1 if levels[i] < 0 else 0, 1)
    suffix_len = 1 if (tc > 10 and t1s < 3) else 0
    for i, level in enumerate(levels[t1s:]):
        code = 2 * abs(level) - 2 if level > 0 else -2 * level - 1
        if i == 0 and t1s < 3:
            code -= 2
        if suffix_len == 0:
            if code < 14:
                w.u(1, code + 1)    # code zeros then a 1
            elif code < 30:         # level_prefix 14 + 4-bit suffix
                w.u(1, 15)
                w.u(code - 14, 4)
            else:                   # level_prefix 15 + 12-bit suffix
                if code - 30 >= 4096:
                    raise ValueError("level beyond prefix-15 escape")
                w.u(1, 16)
                w.u(code - 30, 12)
        else:
            lp = code >> suffix_len
            if lp < 15:
                w.u(1, lp + 1)
                w.u(code & ((1 << suffix_len) - 1), suffix_len)
            else:                   # level_prefix 15 + 12-bit suffix
                rem = code - (15 << suffix_len)
                if rem >= 4096:
                    raise ValueError("level beyond prefix-15 escape")
                w.u(1, 16)
                w.u(rem, 12)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1

    total_zeros = (nz[-1][0] + 1) - tc
    if tc < max_coeff:
        tz_enc = _TZ_CDC_ENC if nC == -1 else _TZ_4x4_ENC
        _write_bits(w, tz_enc[tc][total_zeros])

    zeros_left = total_zeros
    # runs between consecutive nonzeros, highest frequency first
    for i in range(tc - 1):
        hi = nz[tc - 1 - i][0]
        lo = nz[tc - 2 - i][0]
        run = hi - lo - 1
        if zeros_left > 6:
            if run < 7:
                w.u(7 - run, 3)
            else:
                w.u(0, 3)
                w.u(1, run - 7 + 1)   # N zeros then a 1
        elif zeros_left > 0:
            _write_bits(w, _RUN_BEFORE_ENC[zeros_left][run])
        elif run:
            raise AssertionError("zeros exhausted but run nonzero")
        zeros_left -= run
