"""Argon2i / Argon2id (RFC 9106) for the ``compare_argon2`` Bloblang
method (reference: internal/impl/crypto/argon2.go, which delegates to
golang.org/x/crypto/argon2).

From scratch: H and H' are hashlib's blake2b; the G compression
function (BlaMka-modified Blake2b round) runs numpy-vectorized — the
eight row/column permutations of a block apply as single vector ops,
so a m=4096,t=3 verification costs ~12k vectorized G calls instead of
~60M Python integer ops.

Ground truth: the reference's own encoded test hashes
(argon2_test.go:12-14 — argon2id and argon2i of "some-fancy-secret",
m=4096,t=3,p=1) are pinned in tests/test_password_hash.py.

Encoded-hash parsing mirrors decodeArgon2Hash (argon2.go:34-102):
$<format>$v=<ver>$m=<m>,t=<t>,p=<p>$<b64 salt>$<b64 key> with raw
(unpadded) standard base64 and strict parameter syntax.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac
import re
import struct

import numpy as np

__all__ = ["Argon2Error", "argon2_key", "compare"]


class Argon2Error(ValueError):
    pass


_MASK32 = np.uint64(0xFFFFFFFF)
_TWO = np.uint64(2)


def _ror(x, r):
    return (x >> np.uint64(r)) | (x << np.uint64(64 - r))


def _gb(v, a, b, c, d):
    """BlaMka quarter-round on index vectors (in-place on v)."""
    v[a] = v[a] + v[b] + _TWO * (v[a] & _MASK32) * (v[b] & _MASK32)
    v[d] = _ror(v[d] ^ v[a], 32)
    v[c] = v[c] + v[d] + _TWO * (v[c] & _MASK32) * (v[d] & _MASK32)
    v[b] = _ror(v[b] ^ v[c], 24)
    v[a] = v[a] + v[b] + _TWO * (v[a] & _MASK32) * (v[b] & _MASK32)
    v[d] = _ror(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d] + _TWO * (v[c] & _MASK32) * (v[d] & _MASK32)
    v[b] = _ror(v[b] ^ v[c], 63)


def _permute(v):
    """Blake2b-style P over a (16, 8) word matrix: 16 v-words × 8
    parallel permutations (rows or columns of the block)."""
    _gb(v, 0, 4, 8, 12)
    _gb(v, 1, 5, 9, 13)
    _gb(v, 2, 6, 10, 14)
    _gb(v, 3, 7, 11, 15)
    _gb(v, 0, 5, 10, 15)
    _gb(v, 1, 6, 11, 12)
    _gb(v, 2, 7, 8, 13)
    _gb(v, 3, 4, 9, 14)


def _g_compress(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """G(X, Y): 1024-byte blocks as 128 little-endian uint64."""
    r = x ^ y
    q = r.copy()
    # rows: 8 rows of 16 words; register i of row j = words (2i, 2i+1)
    rows = q.reshape(8, 16)
    v = rows.T.copy()  # (16 words, 8 rows)
    _permute(v)
    q = v.T.reshape(128).copy()
    # columns: column j collects 2-word registers (16i + 2j, 16i+2j+1),
    # so v-word 2k of column j is q[16k + 2j]: v[2k, j] = m[k, j, 0]
    m = q.reshape(8, 8, 2)  # [row, register-col, word]
    v = np.empty((16, 8), np.uint64)
    v[0::2] = m[:, :, 0]
    v[1::2] = m[:, :, 1]
    _permute(v)
    m2 = np.empty((8, 8, 2), np.uint64)
    m2[:, :, 0] = v[0::2]
    m2[:, :, 1] = v[1::2]
    return m2.reshape(128) ^ r


def _h_prime(taglen: int, data: bytes) -> bytes:
    """Variable-length hash H' (RFC 9106 §3.3)."""
    pre = struct.pack("<I", taglen) + data
    if taglen <= 64:
        return hashlib.blake2b(pre, digest_size=taglen).digest()
    r = -(-taglen // 32) - 2
    out = bytearray()
    v = hashlib.blake2b(pre, digest_size=64).digest()
    out += v[:32]
    for _ in range(r - 1):
        v = hashlib.blake2b(v, digest_size=64).digest()
        out += v[:32]
    out += hashlib.blake2b(v, digest_size=taglen - 32 * r).digest()
    return bytes(out)


def argon2_key(password: bytes, salt: bytes, time: int, memory: int,
               parallelism: int, keylen: int,
               variant: str = "argon2id") -> bytes:
    """Derive ``keylen`` bytes; ``variant`` is 'argon2i' or 'argon2id'
    (the two formats compare_argon2 accepts), version 0x13."""
    y = {"argon2d": 0, "argon2i": 1, "argon2id": 2}.get(variant)
    if y is None:
        raise Argon2Error(f"unsupported argon2 variant: {variant}")
    if parallelism < 1 or time < 1:
        raise Argon2Error("argon2 t and p must be >= 1")
    p = parallelism
    h0 = hashlib.blake2b(
        struct.pack("<IIIIII", p, keylen, memory, time, 0x13, y)
        + struct.pack("<I", len(password)) + password
        + struct.pack("<I", len(salt)) + salt
        + struct.pack("<I", 0) + struct.pack("<I", 0),
        digest_size=64).digest()

    mprime = max(4 * p, (memory // (4 * p)) * 4 * p)
    q = mprime // p            # lane length
    seg = q // 4               # segment length
    B = np.zeros((p, q, 128), np.uint64)
    for lane in range(p):
        for col in (0, 1):
            blk = _h_prime(1024, h0 + struct.pack("<II", col, lane))
            B[lane, col] = np.frombuffer(blk, "<u8")

    zero_block = np.zeros(128, np.uint64)

    for t in range(time):
        for s in range(4):
            data_independent = (y == 1) or (y == 2 and t == 0 and s < 2)
            for lane in range(p):
                addresses = None
                counter = 0
                start_i = 2 if t == 0 and s == 0 else 0

                def _gen_addresses():
                    nonlocal addresses, counter
                    counter += 1
                    z = np.zeros(128, np.uint64)
                    z[:7] = [t, lane, s, mprime, time, y, counter]
                    addresses = _g_compress(
                        zero_block, _g_compress(zero_block, z))

                if data_independent and start_i % 128 != 0:
                    _gen_addresses()  # first segment starts at i=2
                for i in range(start_i, seg):
                    cur = s * seg + i
                    prev = (cur - 1) % q
                    if data_independent:
                        # address words are indexed by the in-segment
                        # position (x/crypto: addresses[index % 128]),
                        # regenerated at each 128-block boundary
                        if i % 128 == 0:
                            _gen_addresses()
                        j = int(addresses[i % 128])
                    else:
                        j = int(B[lane, prev, 0])
                    j1 = j & 0xFFFFFFFF
                    j2 = (j >> 32) & 0xFFFFFFFF
                    ref_lane = lane if (t == 0 and s == 0) else j2 % p
                    same = ref_lane == lane
                    if t == 0:
                        if s == 0 or same:
                            ref_area = cur - 1
                        else:
                            ref_area = s * seg - (1 if i == 0 else 0)
                    elif same:
                        ref_area = q - seg + i - 1
                    else:
                        ref_area = q - seg - (1 if i == 0 else 0)
                    x = (j1 * j1) >> 32
                    yy = (ref_area * x) >> 32
                    z = ref_area - 1 - yy
                    start = 0 if t == 0 else ((s + 1) * seg) % q
                    ref = (start + z) % q
                    new = _g_compress(B[lane, prev], B[ref_lane, ref])
                    if t > 0:
                        new = new ^ B[lane, cur]
                    B[lane, cur] = new

    c = B[0, q - 1].copy()
    for lane in range(1, p):
        c ^= B[lane, q - 1]
    return _h_prime(keylen, c.astype("<u8").tobytes())


# -------------------------------------------------- encoded-hash form

_PARAMS_RE = re.compile(r"^m=(\d+),t=(\d+),p=(\d+)$")


def _b64raw(s: str) -> bytes:
    try:
        return base64.b64decode(s + "=" * (-len(s) % 4), validate=True)
    except Exception:
        raise Argon2Error("invalid argon2 hash: bad base64") from None


def compare(password: bytes, hashed_secret: str) -> bool:
    """compare_argon2 semantics (argon2.go): parse the encoded hash,
    re-derive with its parameters, constant-time compare."""
    parts = hashed_secret.split("$")
    if len(parts) != 6 or parts[0] != "":
        raise Argon2Error("invalid argon2 hash")
    _, variant, version, params, salt_b64, key_b64 = parts
    if variant not in ("argon2i", "argon2id"):
        raise Argon2Error(
            "invalid argon2 hash: unrecognised argon2 format")
    if not re.fullmatch(r"v=\d+", version):
        raise Argon2Error("invalid argon2 hash: failed to parse version")
    m = _PARAMS_RE.match(params)
    if not m:
        raise Argon2Error(
            "invalid argon2 hash: failed to parse parameters")
    memory, time, par = (int(g) for g in m.groups())
    if par > 255:
        raise Argon2Error(
            "invalid argon2 hash: parallelism does not fit in uint8")
    salt = _b64raw(salt_b64)
    key = _b64raw(key_b64)
    derived = argon2_key(password, salt, time, memory, par, len(key),
                         variant)
    return _hmac.compare_digest(derived, key)
