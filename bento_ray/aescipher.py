"""Pure-Python AES-128/192/256 block cipher + the four modes the
reference's ``encrypt_aes`` / ``decrypt_aes`` Bloblang methods expose
(internal/bloblang/query/methods_strings.go:282-505): ``ctr``, ``ofb``,
``cbc`` and ``gcm`` (Go crypto/cipher semantics — CTR big-endian
counter over the full IV, GCM with 12-byte nonce and 16-byte appended
tag). No crypto library exists in this sandbox, so the cipher is
implemented from FIPS-197 / NIST SP 800-38A/D directly. Throughput is
not a goal — these run per message, matching the reference's
per-message execution.
"""

from __future__ import annotations

import struct


class AESError(ValueError):
    pass


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse in GF(2^8) then the affine transform
    p, q = 1, 1
    sbox = [0] * 256
    while True:
        # p *= 3 (generator), q /= 3 using log/antilog-free walk
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        q ^= q << 1
        q ^= q << 2
        q ^= q << 4
        q &= 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) \
            ^ ((q << 3) | (q >> 5)) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
        if p == 1:
            break
    sbox[0] = 0x63
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return bytes(sbox), bytes(inv)


_SBOX, _INV_SBOX = _build_sbox()


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL2 = bytes(_xtime(i) for i in range(256))
_MUL3 = bytes(_xtime(i) ^ i for i in range(256))
_MUL9 = bytes(_xtime(_xtime(_xtime(i))) ^ i for i in range(256))
_MUL11 = bytes(_xtime(_xtime(_xtime(i)) ^ i) ^ i for i in range(256))
_MUL13 = bytes(_xtime(_xtime(_xtime(i) ^ i)) ^ i for i in range(256))
_MUL14 = bytes(_xtime(_xtime(_xtime(i) ^ i) ^ i) for i in range(256))

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D]


class AES:
    """FIPS-197 block cipher; ``encrypt_block`` / ``decrypt_block``
    over 16-byte blocks."""

    block_size = 16

    def __init__(self, key: bytes):
        key = bytes(key)
        if len(key) not in (16, 24, 32):
            # crypto/aes: KeySizeError text parity
            raise AESError(f"crypto/aes: invalid key size {len(key)}")
        nk = len(key) // 4
        self.rounds = nk + 6
        words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.rounds + 1)):
            t = list(words[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            words.append([a ^ b for a, b in zip(words[i - nk], t)])
        self._rk = [sum(w, []) for w in
                    (words[4 * r:4 * r + 4]
                     for r in range(self.rounds + 1))]

    def encrypt_block(self, block: bytes) -> bytes:
        s = [b ^ k for b, k in zip(block, self._rk[0])]
        for rnd in range(1, self.rounds):
            s = [_SBOX[b] for b in s]
            # ShiftRows on column-major state laid out as b[r + 4c]:
            # byte index r + 4c takes value from r + 4((c + r) % 4)
            s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
            m = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c:4 * c + 4]
                m += [_MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3,
                      a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3,
                      a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3],
                      _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3]]
            s = [b ^ k for b, k in zip(m, self._rk[rnd])]
        s = [_SBOX[b] for b in s]
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        return bytes(b ^ k for b, k in zip(s, self._rk[self.rounds]))

    def decrypt_block(self, block: bytes) -> bytes:
        s = [b ^ k for b, k in zip(block, self._rk[self.rounds])]
        for rnd in range(self.rounds - 1, 0, -1):
            # inverse ShiftRows then inverse SubBytes
            s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
            s = [_INV_SBOX[b] for b in s]
            s = [b ^ k for b, k in zip(s, self._rk[rnd])]
            m = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c:4 * c + 4]
                m += [_MUL14[a0] ^ _MUL11[a1] ^ _MUL13[a2] ^ _MUL9[a3],
                      _MUL9[a0] ^ _MUL14[a1] ^ _MUL11[a2] ^ _MUL13[a3],
                      _MUL13[a0] ^ _MUL9[a1] ^ _MUL14[a2] ^ _MUL11[a3],
                      _MUL11[a0] ^ _MUL13[a1] ^ _MUL9[a2] ^ _MUL14[a3]]
            s = m
        s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        return bytes(b ^ k for b, k in zip(s, self._rk[0]))


# ---------------------------------------------------------------------------
# modes (NIST SP 800-38A, Go crypto/cipher parity)
# ---------------------------------------------------------------------------

def _check_iv(cipher: AES, iv: bytes) -> None:
    if len(iv) != cipher.block_size:
        # methods_strings.go:322/451 error text
        raise AESError("the key must match the initialisation vector size")


def ctr_xor(key: bytes, iv: bytes, data: bytes) -> bytes:
    """cipher.NewCTR: the whole IV is a big-endian counter."""
    c = AES(key)
    _check_iv(c, iv)
    ctr = int.from_bytes(iv, "big")
    out = bytearray()
    for off in range(0, len(data), 16):
        ks = c.encrypt_block(ctr.to_bytes(16, "big"))
        ctr = (ctr + 1) % (1 << 128)
        chunk = data[off:off + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
    return bytes(out)


def ofb_xor(key: bytes, iv: bytes, data: bytes) -> bytes:
    c = AES(key)
    _check_iv(c, iv)
    feedback = bytes(iv)
    out = bytearray()
    for off in range(0, len(data), 16):
        feedback = c.encrypt_block(feedback)
        chunk = data[off:off + 16]
        out += bytes(a ^ b for a, b in zip(chunk, feedback))
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    c = AES(key)
    _check_iv(c, iv)
    if len(data) % 16:
        raise AESError("plaintext is not a multiple of the block size")
    prev = bytes(iv)
    out = bytearray()
    for off in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        prev = c.encrypt_block(block)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    c = AES(key)
    _check_iv(c, iv)
    if len(data) % 16:
        raise AESError("ciphertext is not a multiple of the block size")
    prev = bytes(iv)
    out = bytearray()
    for off in range(0, len(data), 16):
        block = data[off:off + 16]
        out += bytes(a ^ b for a, b in zip(c.decrypt_block(block), prev))
        prev = block
    return bytes(out)


# --------------------------------------------------------------------- GCM

def _gf_mult(x: int, y: int) -> int:
    """GF(2^128) multiply, big-endian bit order (SP 800-38D §6.3)."""
    z, v = 0, x
    for i in range(127, -1, -1):
        if (y >> i) & 1:
            z ^= v
        if v & 1:
            v = (v >> 1) ^ (0xE1 << 120)
        else:
            v >>= 1
    return z


def _ghash(h: int, *parts: bytes) -> int:
    y = 0
    for part in parts:
        for off in range(0, len(part), 16):
            block = part[off:off + 16].ljust(16, b"\x00")
            y = _gf_mult(y ^ int.from_bytes(block, "big"), h)
    return y


def _gcm_tag_and_stream(c: AES, nonce: bytes, data: bytes,
                        encrypting: bool) -> tuple[bytes, bytes]:
    h = int.from_bytes(c.encrypt_block(b"\x00" * 16), "big")
    j0 = nonce + b"\x00\x00\x00\x01"
    # CTR keystream starting at inc32(J0)
    ctr_pre = int.from_bytes(j0, "big")
    out = bytearray()
    ctr = ctr_pre
    for off in range(0, len(data), 16):
        low32 = ((ctr & 0xFFFFFFFF) + 1) & 0xFFFFFFFF
        ctr = (ctr & ~0xFFFFFFFF) | low32
        ks = c.encrypt_block(ctr.to_bytes(16, "big"))
        chunk = data[off:off + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
    ciphertext = bytes(out) if encrypting else data
    lens = struct.pack(">QQ", 0, len(ciphertext) * 8)  # no AAD
    s = _ghash(h, ciphertext, lens)
    tag = bytes(a ^ b for a, b in
                zip(c.encrypt_block(j0), s.to_bytes(16, "big")))
    return bytes(out), tag


def gcm_seal(key: bytes, nonce: bytes, plaintext: bytes) -> bytes:
    """cipher.NewGCM(...).Seal with nil AAD: ciphertext || 16-byte tag.
    Go's standard GCM requires a 12-byte nonce."""
    c = AES(key)
    if len(nonce) != 12:
        raise AESError("crypto/cipher: incorrect nonce length given to GCM")
    ct, tag = _gcm_tag_and_stream(c, bytes(nonce), bytes(plaintext), True)
    return ct + tag


def gcm_open(key: bytes, nonce: bytes, sealed: bytes) -> bytes:
    c = AES(key)
    if len(nonce) != 12:
        raise AESError("crypto/cipher: incorrect nonce length given to GCM")
    sealed = bytes(sealed)
    if len(sealed) < 16:
        raise AESError("gcm decrypting failed: cipher: message "
                       "authentication failed")
    ct, tag = sealed[:-16], sealed[-16:]
    pt, want = _gcm_tag_and_stream(c, bytes(nonce), ct, False)
    if want != tag:
        raise AESError("gcm decrypting failed: cipher: message "
                       "authentication failed")
    return pt
