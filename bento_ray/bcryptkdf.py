"""bcrypt verification for the ``compare_bcrypt`` Bloblang method
(reference: internal/impl/crypto/bcrypt.go → golang.org/x/crypto/bcrypt).

Pure-Python EksBlowfish, with one twist: the Blowfish P-array and
S-boxes are the fractional hexadecimal digits of π, so instead of
embedding 4168 bytes of constants (and risking a silent transcription
error) they are COMPUTED at first use with the Chudnovsky series under
``decimal`` — then sanity-pinned against the two universally known
leading words (0x243F6A88, 0x85A308D3). When the platform libcrypt
supports ``$2*$`` hashes (libxcrypt does), ``compare`` takes that
C-speed fast path; the pure path is the portable fallback and is
cross-checked against libxcrypt in tests.

Semantics mirror x/crypto/bcrypt: password is UTF-8 + trailing NUL,
max 72 bytes; cost in [4, 31]; hash format
``$2<minor>$<cost>$<22-char salt><31-char digest>`` in bcrypt's own
base64 alphabet; the 24th output byte is discarded.
"""

from __future__ import annotations

import hmac as _hmac

__all__ = ["BcryptError", "bcrypt_hash", "compare"]

_M32 = 0xFFFFFFFF
_ALPHA = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_DEC = {c: i for i, c in enumerate(_ALPHA)}


class BcryptError(ValueError):
    pass


# ------------------------------------------------- π-derived tables

_PI_WORDS: list[int] | None = None


def _pi_words() -> list[int]:
    """First 18 + 4·256 uint32 words of π's fractional hex digits
    (the Blowfish init tables), via Chudnovsky under decimal."""
    global _PI_WORDS
    if _PI_WORDS is not None:
        return _PI_WORDS
    from decimal import Decimal, getcontext

    nwords = 18 + 4 * 256
    digits = int(nwords * 32 * 0.30103) + 30  # bits → decimal digits
    getcontext().prec = digits + 20
    c = 426880 * Decimal(10005).sqrt()
    m, ell, x, k = 1, 13591409, 1, 6
    s = Decimal(ell)
    for i in range(1, digits // 14 + 2):
        m = m * (k ** 3 - 16 * k) // i ** 3
        ell += 545140134
        x *= -262537412640768000
        s += Decimal(m * ell) / x
        k += 12
    pi = c / s
    scaled = int((pi - 3) * (Decimal(2) ** (32 * nwords)))
    words = [(scaled >> (32 * (nwords - 1 - i))) & _M32
             for i in range(nwords)]
    # the first two fractional-hex words of π are universally known
    assert words[0] == 0x243F6A88 and words[1] == 0x85A308D3, \
        "π digit computation failed"
    _PI_WORDS = words
    return words


class _Blowfish:
    def __init__(self):
        w = _pi_words()
        self.p = list(w[:18])
        self.s = [list(w[18 + 256 * i:18 + 256 * (i + 1)])
                  for i in range(4)]

    def encrypt(self, xl: int, xr: int) -> tuple[int, int]:
        p = self.p
        s0, s1, s2, s3 = self.s
        for i in range(16):
            xl ^= p[i]
            xr ^= ((((s0[xl >> 24] + s1[(xl >> 16) & 0xFF]) & _M32)
                    ^ s2[(xl >> 8) & 0xFF])
                   + s3[xl & 0xFF]) & _M32
            xl, xr = xr, xl
        xl, xr = xr, xl
        xr ^= p[16]
        xl ^= p[17]
        return xl, xr

    def expand_key(self, data: bytes | None, key: bytes):
        """EksBlowfish ExpandKey: fold the key into P cyclically, then
        re-encrypt the chained block (XORed with ``data`` halves when
        salting) through P and all four S-boxes."""
        p, key_len = self.p, len(key)
        j = 0
        for i in range(18):
            w = 0
            for _ in range(4):
                w = ((w << 8) | key[j]) & _M32
                j = (j + 1) % key_len
            p[i] ^= w
        l = r = 0
        dpos = 0

        def next_data_word() -> int:
            nonlocal dpos
            w = int.from_bytes(
                bytes(data[(dpos + k) % len(data)] for k in range(4)),
                "big")
            dpos = (dpos + 4) % len(data)
            return w

        for i in range(0, 18, 2):
            if data is not None:
                l ^= next_data_word()
                r ^= next_data_word()
            l, r = self.encrypt(l, r)
            p[i], p[i + 1] = l, r
        for box in self.s:
            for i in range(0, 256, 2):
                if data is not None:
                    l ^= next_data_word()
                    r ^= next_data_word()
                l, r = self.encrypt(l, r)
                box[i], box[i + 1] = l, r


def _b64_encode(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        c1 = raw[i]
        out.append(_ALPHA[c1 >> 2])
        c1 = (c1 & 0x03) << 4
        if i + 1 >= len(raw):
            out.append(_ALPHA[c1])
            break
        c2 = raw[i + 1]
        out.append(_ALPHA[c1 | (c2 >> 4)])
        c1 = (c2 & 0x0F) << 2
        if i + 2 >= len(raw):
            out.append(_ALPHA[c1])
            break
        c3 = raw[i + 2]
        out.append(_ALPHA[c1 | (c3 >> 6)])
        out.append(_ALPHA[c3 & 0x3F])
        i += 3
    return "".join(out)


def _b64_decode(s: str, nbytes: int) -> bytes:
    bits = 0
    acc = 0
    out = bytearray()
    for ch in s:
        if ch not in _DEC:
            raise BcryptError("invalid bcrypt base64")
        acc = (acc << 6) | _DEC[ch]
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out[:nbytes])


def bcrypt_hash(password: bytes, cost: int, salt: bytes) -> bytes:
    """EksBlowfish bcrypt digest (23 bytes) of password (NUL appended,
    x/crypto parity) under a 16-byte salt."""
    if not 4 <= cost <= 31:
        raise BcryptError(f"cost {cost} is outside allowed range [4,31]")
    if len(password) > 72:
        raise BcryptError("password length exceeds 72 bytes")
    if len(salt) != 16:
        raise BcryptError("bcrypt salt must be 16 bytes")
    key = password + b"\x00"
    bf = _Blowfish()
    bf.expand_key(salt, key)
    for _ in range(1 << cost):
        bf.expand_key(None, key)
        bf.expand_key(None, salt)
    magic = b"OrpheanBeholderScryDoubt"
    out = bytearray()
    for blk in range(3):
        l = int.from_bytes(magic[8 * blk:8 * blk + 4], "big")
        r = int.from_bytes(magic[8 * blk + 4:8 * blk + 8], "big")
        for _ in range(64):
            l, r = bf.encrypt(l, r)
        out += l.to_bytes(4, "big") + r.to_bytes(4, "big")
    return bytes(out[:23])


def _parse(hashed: str) -> tuple[str, int, str, str]:
    parts = hashed.split("$")
    if len(parts) != 4 or parts[0] != "" or not parts[1].startswith("2"):
        raise BcryptError("hashedSecret too short to be a bcrypted password")
    version = parts[1]
    if version not in ("2", "2a", "2b", "2x", "2y"):
        raise BcryptError(f"bcrypt hash version {version!r} not supported")
    try:
        cost = int(parts[2])
    except ValueError:
        raise BcryptError("invalid bcrypt cost") from None
    if len(parts[3]) < 53:
        raise BcryptError("hashedSecret too short to be a bcrypted password")
    return version, cost, parts[3][:22], parts[3][22:53]


def _compare_pure(password: bytes, hashed: str) -> bool:
    _, cost, salt_s, digest_s = _parse(hashed)
    salt = _b64_decode(salt_s, 16)
    want = _b64_decode(digest_s, 23)
    got = bcrypt_hash(password, cost, salt)
    return _hmac.compare_digest(got, want)


def compare(password: bytes, hashed: str) -> bool:
    """compare_bcrypt semantics (bcrypt.go): True/False on a
    well-formed hash, error otherwise. Uses the platform libcrypt's
    C bcrypt when it supports $2*$ (libxcrypt), else pure Python."""
    _parse(hashed)  # malformed hashes must error on both paths
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import crypt  # deprecated stdlib; removed in 3.13

        out = crypt.crypt(password.decode("utf-8", "surrogateescape"),
                          hashed)
        if isinstance(out, str) and len(out) == len(hashed) and \
                out[:7] == hashed[:7]:
            return _hmac.compare_digest(out, hashed)
    except Exception:
        pass
    return _compare_pure(password, hashed)
