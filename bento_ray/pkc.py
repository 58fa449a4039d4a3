"""Public-key signature primitives for the JWT Bloblang methods
(reference: internal/impl/crypto/jwt_parse.go, jwt_sign.go — which
delegate to golang-jwt + Go's crypto/rsa, crypto/ecdsa).

From-scratch on Python integers — the sandbox has no crypto libraries:

- minimal PEM + DER codec (SEQUENCE/INTEGER/BIT STRING/OCTET
  STRING/OID/NULL + context tags) for the key formats golang-jwt
  accepts: PKCS#1 RSA public/private, SPKI public, PKCS#8 private,
  SEC1 EC private;
- RSA PKCS#1 v1.5 signatures (RFC 8017 §8.2) with the DigestInfo
  prefix BUILT via the DER encoder from the SHA-2 OIDs — no memorised
  byte-string constants;
- ECDSA over NIST P-256/P-384/P-521 with RFC 6979 deterministic
  nonces (Go uses random nonces; verification interop is what the
  reference's sample tokens pin down).

Curve constants are validated at import: the base point must satisfy
the curve equation and have order n (n·G = ∞) — a single wrong digit
in any constant fails these checks with overwhelming probability. The
end-to-end ground truth is the reference's embedded sample tokens +
public keys (tests/test_jwt.py), produced by Go's own crypto stack.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as _hmac

__all__ = [
    "PkcError",
    "pem_decode",
    "parse_rsa_public_key",
    "parse_rsa_private_key",
    "rsa_sign_pkcs1v15",
    "rsa_verify_pkcs1v15",
    "parse_ec_public_key",
    "parse_ec_private_key",
    "ecdsa_sign",
    "ecdsa_verify",
    "CURVES",
]


class PkcError(ValueError):
    pass


# ---------------------------------------------------------------- PEM

def pem_decode(text: str, *want_labels: str) -> tuple[str, bytes]:
    """Extract (label, DER bytes) from the first PEM block; error if
    ``want_labels`` is given and the label is not among them."""
    lines = [ln.strip() for ln in text.strip().splitlines()]
    if not lines or not lines[0].startswith("-----BEGIN "):
        raise PkcError("invalid PEM: missing BEGIN header")
    label = lines[0][len("-----BEGIN "):].rstrip("-").strip()
    body = []
    for ln in lines[1:]:
        if ln.startswith("-----END "):
            break
        body.append(ln)
    else:
        raise PkcError("invalid PEM: missing END footer")
    try:
        der = base64.b64decode("".join(body), validate=True)
    except Exception as exc:
        raise PkcError(f"invalid PEM base64: {exc}") from None
    if want_labels and label not in want_labels:
        raise PkcError(f"unexpected PEM label {label!r}")
    return label, der


# ---------------------------------------------------------------- DER

SEQUENCE = 0x30
INTEGER = 0x02
BIT_STRING = 0x03
OCTET_STRING = 0x04
NULL = 0x05
OID = 0x06


def _der_read(b: bytes, i: int) -> tuple[int, bytes, int]:
    if i + 2 > len(b):
        raise PkcError("truncated DER")
    tag = b[i]
    ln = b[i + 1]
    i += 2
    if ln & 0x80:
        k = ln & 0x7F
        if k == 0 or i + k > len(b):
            raise PkcError("bad DER length")
        ln = int.from_bytes(b[i:i + k], "big")
        i += k
    if i + ln > len(b):
        raise PkcError("truncated DER value")
    return tag, b[i:i + ln], i + ln


def der_children(content: bytes) -> list[tuple[int, bytes]]:
    out, i = [], 0
    while i < len(content):
        tag, val, i = _der_read(content, i)
        out.append((tag, val))
    return out


def der_top(b: bytes, expect_tag: int = SEQUENCE) -> list[tuple[int, bytes]]:
    tag, val, end = _der_read(b, 0)
    if tag != expect_tag:
        raise PkcError(f"expected DER tag 0x{expect_tag:02x}, got 0x{tag:02x}")
    return der_children(val)


def der_uint(val: bytes) -> int:
    return int.from_bytes(val, "big")


def der_oid_decode(val: bytes) -> tuple[int, ...]:
    if not val:
        raise PkcError("empty OID")
    arcs = [val[0] // 40, val[0] % 40]
    acc = 0
    for byte in val[1:]:
        acc = (acc << 7) | (byte & 0x7F)
        if not byte & 0x80:
            arcs.append(acc)
            acc = 0
    return tuple(arcs)


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def der_encode(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _der_len(len(content)) + content


def der_encode_uint(v: int) -> bytes:
    body = v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")
    if body[0] & 0x80:
        body = b"\x00" + body
    return der_encode(INTEGER, body)


def der_encode_oid(arcs: tuple[int, ...]) -> bytes:
    body = bytearray([arcs[0] * 40 + arcs[1]])
    for arc in arcs[2:]:
        chunk = bytearray([arc & 0x7F])
        arc >>= 7
        while arc:
            chunk.append(0x80 | (arc & 0x7F))
            arc >>= 7
        body.extend(reversed(chunk))
    return der_encode(OID, bytes(body))


# ---------------------------------------------------------------- RSA

_OID_RSA = (1, 2, 840, 113549, 1, 1, 1)
# SHA-2 digest OIDs (NIST arc) — DigestInfo is BUILT from these.
_HASH_OIDS = {
    "sha256": (2, 16, 840, 1, 101, 3, 4, 2, 1),
    "sha384": (2, 16, 840, 1, 101, 3, 4, 2, 2),
    "sha512": (2, 16, 840, 1, 101, 3, 4, 2, 3),
}


class RsaKey:
    def __init__(self, n: int, e: int, d: int | None = None):
        self.n, self.e, self.d = n, e, d

    @property
    def size(self) -> int:
        return (self.n.bit_length() + 7) // 8


def _rsa_from_pkcs1_private(children) -> RsaKey:
    ints = [der_uint(v) for t, v in children if t == INTEGER]
    if len(ints) < 6:
        raise PkcError("truncated PKCS#1 RSA private key")
    _, n, e, d = ints[0], ints[1], ints[2], ints[3]
    return RsaKey(n, e, d)


def parse_rsa_private_key(pem: str) -> RsaKey:
    label, der = pem_decode(pem)
    kids = der_top(der)
    if label == "RSA PRIVATE KEY":
        return _rsa_from_pkcs1_private(kids)
    if label == "PRIVATE KEY":  # PKCS#8
        if len(kids) != 3 or kids[2][0] != OCTET_STRING:
            raise PkcError("bad PKCS#8 structure")
        alg = der_children(kids[1][1])
        if der_oid_decode(alg[0][1]) != _OID_RSA:
            raise PkcError("PKCS#8 key is not RSA")
        return _rsa_from_pkcs1_private(der_top(kids[2][1]))
    raise PkcError(f"not an RSA private key PEM: {label!r}")


def parse_rsa_public_key(pem: str) -> RsaKey:
    label, der = pem_decode(pem)
    kids = der_top(der)
    if label == "RSA PUBLIC KEY":  # PKCS#1
        n, e = (der_uint(v) for _, v in kids[:2])
        return RsaKey(n, e)
    if label == "PUBLIC KEY":  # SPKI
        alg = der_children(kids[0][1])
        if der_oid_decode(alg[0][1]) != _OID_RSA:
            raise PkcError("SPKI key is not RSA")
        bits = kids[1][1]
        if bits[:1] != b"\x00":
            raise PkcError("unexpected BIT STRING padding")
        inner = der_top(bits[1:])
        n, e = (der_uint(v) for _, v in inner[:2])
        return RsaKey(n, e)
    raise PkcError(f"not an RSA public key PEM: {label!r}")


def _digest_info(data: bytes, hashname: str) -> bytes:
    digest = hashlib.new(hashname, data).digest()
    alg_id = der_encode(
        SEQUENCE,
        der_encode_oid(_HASH_OIDS[hashname]) + der_encode(NULL, b""))
    return der_encode(SEQUENCE, alg_id + der_encode(OCTET_STRING, digest))


def _emsa_pkcs1v15(data: bytes, hashname: str, em_len: int) -> bytes:
    t = _digest_info(data, hashname)
    if em_len < len(t) + 11:
        raise PkcError("RSA key too small for digest")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def rsa_sign_pkcs1v15(key: RsaKey, data: bytes, hashname: str) -> bytes:
    if key.d is None:
        raise PkcError("RSA private key required for signing")
    em = _emsa_pkcs1v15(data, hashname, key.size)
    s = pow(int.from_bytes(em, "big"), key.d, key.n)
    return s.to_bytes(key.size, "big")


def rsa_verify_pkcs1v15(key: RsaKey, data: bytes, sig: bytes,
                        hashname: str) -> bool:
    if len(sig) != key.size:
        return False
    s = int.from_bytes(sig, "big")
    if s >= key.n:
        return False
    em = pow(s, key.e, key.n).to_bytes(key.size, "big")
    return _hmac.compare_digest(em, _emsa_pkcs1v15(data, hashname, key.size))


# -------------------------------------------------------------- ECDSA

class Curve:
    """Short-Weierstrass curve y² = x³ − 3x + b over GF(p)."""

    def __init__(self, name, p, b, n, gx, gy, hashname):
        self.name, self.p, self.b, self.n = name, p, b, n
        self.g = (gx, gy)
        self.hashname = hashname
        self.qlen = n.bit_length()
        self.nbytes = (self.qlen + 7) // 8
        # transcription guards: G on curve, and ord(G) = n
        if (gy * gy - (gx * gx * gx - 3 * gx + b)) % p != 0:
            raise AssertionError(f"{name}: base point not on curve")
        if self._mul(n, self.g) is not None:
            raise AssertionError(f"{name}: n·G != infinity")

    # affine arithmetic; None is the point at infinity
    def _add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        p = self.p
        if P[0] == Q[0]:
            if (P[1] + Q[1]) % p == 0:
                return None
            lam = (3 * P[0] * P[0] - 3) * pow(2 * P[1], p - 2, p) % p
        else:
            lam = (Q[1] - P[1]) * pow(Q[0] - P[0], p - 2, p) % p
        x = (lam * lam - P[0] - Q[0]) % p
        return (x, (lam * (P[0] - x) - P[1]) % p)

    def _mul(self, k, P):
        acc = None
        while k:
            if k & 1:
                acc = self._add(acc, P)
            P = self._add(P, P)
            k >>= 1
        return acc

    def on_curve(self, P) -> bool:
        x, y = P
        return 0 <= x < self.p and 0 <= y < self.p and \
            (y * y - (x * x * x - 3 * x + self.b)) % self.p == 0


def _p256():
    p = 2 ** 256 - 2 ** 224 + 2 ** 192 + 2 ** 96 - 1
    return Curve(
        "P-256", p,
        0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
        0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
        0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
        0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
        "sha256")


def _p384():
    p = 2 ** 384 - 2 ** 128 - 2 ** 96 + 2 ** 32 - 1
    return Curve(
        "P-384", p,
        0xB3312FA7E23EE7E4988E056BE3F82D19181D9C6EFE8141120314088F5013875AC656398D8A2ED19D2A85C8EDD3EC2AEF,
        0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFC7634D81F4372DDF581A0DB248B0A77AECEC196ACCC52973,
        0xAA87CA22BE8B05378EB1C71EF320AD746E1D3B628BA79B9859F741E082542A385502F25DBF55296C3A545E3872760AB7,
        0x3617DE4A96262C6F5D9E98BF9292DC29F8F41DBD289A147CE9DA3113B5F0B8C00A60B1CE1D7E819D7A431D7C90EA0E5F,
        "sha384")


def _p521():
    p = 2 ** 521 - 1
    return Curve(
        "P-521", p,
        0x0051953EB9618E1C9A1F929A21A0B68540EEA2DA725B99B315F3B8B489918EF109E156193951EC7E937B1652C0BD3BB1BF073573DF883D2C34F1EF451FD46B503F00,
        0x01FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFA51868783BF2F966B7FCC0148F709A5D03BB5C9B8899C47AEBB6FB71E91386409,
        0x00C6858E06B70404E9CD9E3ECB662395B4429C648139053FB521F828AF606B4D3DBAA14B5E77EFE75928FE1DC127A2FFA8DE3348B3C1856A429BF97E7E31C2E5BD66,
        0x011839296A789A3BC0045C8A5FB42C7D1BD998F54449579B446817AFBD17273E662C97EE72995EF42640C550B9013FAD0761353C7086A272C24088BE94769FD16650,
        "sha512")


CURVES: dict[str, Curve] = {}
for _mk in (_p256, _p384, _p521):
    _c = _mk()
    CURVES[_c.name] = _c

_OID_EC_PUBKEY = (1, 2, 840, 10045, 2, 1)
_CURVE_OIDS = {
    (1, 2, 840, 10045, 3, 1, 7): "P-256",
    (1, 3, 132, 0, 34): "P-384",
    (1, 3, 132, 0, 35): "P-521",
}


def _ec_point_decode(curve: Curve, raw: bytes):
    fl = (curve.p.bit_length() + 7) // 8
    if len(raw) != 1 + 2 * fl or raw[0] != 0x04:
        raise PkcError("only uncompressed EC points supported")
    P = (int.from_bytes(raw[1:1 + fl], "big"),
         int.from_bytes(raw[1 + fl:], "big"))
    if not curve.on_curve(P):
        raise PkcError("EC public point not on curve")
    return P


def parse_ec_public_key(pem: str):
    """→ (Curve, point) from an SPKI 'PUBLIC KEY' PEM."""
    label, der = pem_decode(pem, "PUBLIC KEY")
    kids = der_top(der)
    alg = der_children(kids[0][1])
    if der_oid_decode(alg[0][1]) != _OID_EC_PUBKEY:
        raise PkcError("SPKI key is not EC")
    curve_name = _CURVE_OIDS.get(der_oid_decode(alg[1][1]))
    if curve_name is None:
        raise PkcError("unsupported EC curve")
    curve = CURVES[curve_name]
    bits = kids[1][1]
    if bits[:1] != b"\x00":
        raise PkcError("unexpected BIT STRING padding")
    return curve, _ec_point_decode(curve, bits[1:])


def _ec_from_sec1(kids, outer_curve: str | None):
    d = None
    curve_name = outer_curve
    for tag, val in kids:
        if tag == OCTET_STRING and d is None:
            d = int.from_bytes(val, "big")
        elif tag == 0xA0:  # [0] parameters: curve OID
            inner = der_children(val) or [(OID, val)]
            # value may be a bare OID body or a wrapped OID TLV
            tag2, val2 = inner[0]
            arcs = der_oid_decode(val2 if tag2 == OID else val)
            curve_name = _CURVE_OIDS.get(arcs, curve_name)
    if d is None or curve_name is None:
        raise PkcError("bad SEC1 EC private key")
    curve = CURVES[curve_name]
    return curve, d


def parse_ec_private_key(pem: str):
    """→ (Curve, d) from a SEC1 'EC PRIVATE KEY' or PKCS#8 PEM."""
    label, der = pem_decode(pem)
    kids = der_top(der)
    if label == "EC PRIVATE KEY":
        return _ec_from_sec1(kids, None)
    if label == "PRIVATE KEY":  # PKCS#8
        alg = der_children(kids[1][1])
        if der_oid_decode(alg[0][1]) != _OID_EC_PUBKEY:
            raise PkcError("PKCS#8 key is not EC")
        curve_name = _CURVE_OIDS.get(der_oid_decode(alg[1][1]))
        return _ec_from_sec1(der_top(kids[2][1]), curve_name)
    raise PkcError(f"not an EC private key PEM: {label!r}")


def _bits2int(data: bytes, qlen: int) -> int:
    v = int.from_bytes(data, "big")
    blen = len(data) * 8
    return v >> (blen - qlen) if blen > qlen else v


def _rfc6979_k(curve: Curve, d: int, h1: bytes):
    """RFC 6979 §3.2 deterministic nonce generator (yields candidate
    k values; the caller retries on degenerate r/s)."""
    hname = curve.hashname
    hlen = hashlib.new(hname).digest_size
    x_oct = d.to_bytes(curve.nbytes, "big")
    z2 = _bits2int(h1, curve.qlen) % curve.n
    h1_oct = z2.to_bytes(curve.nbytes, "big")
    V = b"\x01" * hlen
    K = b"\x00" * hlen
    K = _hmac.new(K, V + b"\x00" + x_oct + h1_oct, hname).digest()
    V = _hmac.new(K, V, hname).digest()
    K = _hmac.new(K, V + b"\x01" + x_oct + h1_oct, hname).digest()
    V = _hmac.new(K, V, hname).digest()
    while True:
        t = b""
        while len(t) * 8 < curve.qlen:
            V = _hmac.new(K, V, hname).digest()
            t += V
        k = _bits2int(t, curve.qlen)
        if 1 <= k < curve.n:
            yield k
        K = _hmac.new(K, V + b"\x00", hname).digest()
        V = _hmac.new(K, V, hname).digest()


def ecdsa_sign(curve: Curve, d: int, data: bytes) -> bytes:
    """Deterministic ECDSA (RFC 6979); returns the JWS raw r‖s
    encoding, each padded to the curve's byte length."""
    h1 = hashlib.new(curve.hashname, data).digest()
    e = _bits2int(h1, curve.qlen) % curve.n
    for k in _rfc6979_k(curve, d, h1):
        P = curve._mul(k, curve.g)
        if P is None:
            continue
        r = P[0] % curve.n
        if r == 0:
            continue
        s = pow(k, curve.n - 2, curve.n) * (e + r * d) % curve.n
        if s == 0:
            continue
        return r.to_bytes(curve.nbytes, "big") + \
            s.to_bytes(curve.nbytes, "big")


def ecdsa_verify(curve: Curve, Q, data: bytes, sig: bytes) -> bool:
    if len(sig) != 2 * curve.nbytes:
        return False
    r = int.from_bytes(sig[:curve.nbytes], "big")
    s = int.from_bytes(sig[curve.nbytes:], "big")
    if not (1 <= r < curve.n and 1 <= s < curve.n):
        return False
    h1 = hashlib.new(curve.hashname, data).digest()
    e = _bits2int(h1, curve.qlen) % curve.n
    w = pow(s, curve.n - 2, curve.n)
    P = curve._add(curve._mul(e * w % curve.n, curve.g),
                   curve._mul(r * w % curve.n, Q))
    return P is not None and P[0] % curve.n == r
