"""JSON Web Token (JWS compact serialization) signing/verification for
the ``parse_jwt_*`` / ``sign_jwt_*`` Bloblang methods.

Reference: internal/impl/crypto/jwt_parse.go and jwt_sign.go, which
delegate to golang-jwt/v5 over Go's crypto stack. Parity points:

- header is ``{"alg": ..., "typ": "JWT"}`` and both header and claims
  serialize Go-style (sorted keys, integral floats without ``.0``) —
  ``go_json_dumps`` — so HMAC tokens are byte-identical to golang-jwt
  output (pinned against the reference's embedded sample tokens);
- parse rejects a token whose header alg differs from the method's
  (``incorrect signing method``), then verifies the signature, then
  applies golang-jwt v5's default claim checks (``exp``/``nbf`` when
  present; no aud/iss validation);
- ES* signatures are the JWS raw ``r‖s`` encoding; RS* are PKCS#1
  v1.5. Signing uses RFC 6979 deterministic nonces for ECDSA (Go
  randomizes; verifiers accept both).
"""

from __future__ import annotations

import base64
import hmac as _hmac
import json
import time

from bento_ray import pkc
from bento_ray.blobl.values import go_json_dumps

__all__ = ["JWTError", "sign_jwt", "parse_jwt", "JWT_ALGS"]


class JWTError(ValueError):
    pass


_HS = {"HS256": "sha256", "HS384": "sha384", "HS512": "sha512"}
_RS = {"RS256": "sha256", "RS384": "sha384", "RS512": "sha512"}
_ES = {"ES256": "P-256", "ES384": "P-384", "ES512": "P-521"}
JWT_ALGS = (*_HS, *_RS, *_ES)


def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).decode().rstrip("=")


def _b64url_dec(s: str) -> bytes:
    try:
        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))
    except Exception:
        raise JWTError(
            "failed to parse JWT string: invalid base64url segment"
        ) from None


def sign_jwt(claims: dict, alg: str, signing_secret: str) -> str:
    """Sign a claims object; returns the compact JWS string."""
    if alg not in JWT_ALGS:
        raise JWTError(f"unsupported JWT algorithm: {alg}")
    header = {"alg": alg, "typ": "JWT"}
    signing = _b64url(go_json_dumps(header).encode()) + "." + \
        _b64url(go_json_dumps(claims).encode())
    try:
        if alg in _HS:
            sig = _hmac.new(signing_secret.encode(), signing.encode(),
                            _HS[alg]).digest()
        elif alg in _RS:
            key = pkc.parse_rsa_private_key(signing_secret)
            sig = pkc.rsa_sign_pkcs1v15(key, signing.encode(), _RS[alg])
        else:
            curve, d = pkc.parse_ec_private_key(signing_secret)
            if curve.name != _ES[alg]:
                raise pkc.PkcError(
                    f"{alg} requires a {_ES[alg]} key, got {curve.name}")
            sig = pkc.ecdsa_sign(curve, d, signing.encode())
    except pkc.PkcError as exc:
        raise JWTError(f"failed to sign token: {exc}") from None
    return signing + "." + _b64url(sig)


def _verify(alg: str, signing: bytes, sig: bytes, secret: str) -> bool:
    if alg in _HS:
        want = _hmac.new(secret.encode(), signing, _HS[alg]).digest()
        return _hmac.compare_digest(want, sig)
    if alg in _RS:
        key = pkc.parse_rsa_public_key(secret)
        return pkc.rsa_verify_pkcs1v15(key, signing, sig, _RS[alg])
    curve, q = pkc.parse_ec_public_key(secret)
    if curve.name != _ES[alg]:
        raise pkc.PkcError(
            f"{alg} requires a {_ES[alg]} key, got {curve.name}")
    return pkc.ecdsa_verify(curve, q, signing, sig)


def parse_jwt(token: str, alg: str, signing_secret: str,
              now: float | None = None) -> dict:
    """Verify ``token`` with ``alg`` and return the claims object.
    Mirrors jwtParser (jwt_parse.go:32-60): a mismatched header alg is
    'incorrect signing method'; exp/nbf are validated when present
    (golang-jwt v5 defaults), other claims are not."""
    parts = token.split(".")
    if len(parts) != 3:
        raise JWTError("failed to parse JWT string: token contains an "
                       "invalid number of segments")
    try:
        header = json.loads(_b64url_dec(parts[0]))
    except (ValueError, JWTError):
        raise JWTError(
            "failed to parse JWT string: invalid header") from None
    tok_alg = header.get("alg") if isinstance(header, dict) else None
    if tok_alg != alg:
        raise JWTError(
            f"failed to parse JWT string: incorrect signing method: "
            f"{tok_alg}")
    signing = f"{parts[0]}.{parts[1]}".encode()
    sig = _b64url_dec(parts[2])
    try:
        ok = _verify(alg, signing, sig, signing_secret)
    except pkc.PkcError as exc:
        raise JWTError(f"failed to parse JWT string: {exc}") from None
    if not ok:
        raise JWTError(
            "failed to parse JWT string: token signature is invalid")
    try:
        claims = json.loads(_b64url_dec(parts[1]))
    except (ValueError, JWTError):
        raise JWTError(
            "failed to parse JWT string: invalid claims") from None
    if not isinstance(claims, dict):
        raise JWTError(
            "failed to parse JWT string: claims is not an object")
    t = time.time() if now is None else now
    exp = claims.get("exp")
    if isinstance(exp, (int, float)) and t > exp:
        raise JWTError("failed to parse JWT string: token is expired")
    nbf = claims.get("nbf")
    if isinstance(nbf, (int, float)) and t < nbf:
        raise JWTError(
            "failed to parse JWT string: token is not valid yet")
    return claims
