"""compare_argon2 / compare_bcrypt parity
(internal/impl/crypto/argon2.go, bcrypt.go). Ground truth: the
reference tests' own encoded hashes, the `cryptography` Argon2id KDF,
and the platform libxcrypt bcrypt."""

import pytest

from bento_ray import argon2kdf, bcryptkdf
from bento_ray.blobl import compile_mapping

# argon2_test.go:12-14 — both derived from "some-fancy-secret"
ARGON2ID = ("$argon2id$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$"
            "XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U")
ARGON2I = ("$argon2i$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$"
           "fyLJGjF+IArVfBnQ6ihK8jQwdNv4sv1aEZGVzBu9oAs")
# bcrypt_test.go:13 — "some-fancy-secret" at cost 10
BCRYPT = "$2y$10$ywv67wCBlpSVu.M7WrZwxuivaNrY.8fe4OF0YzQPtPomk7RS.W9aq"


def test_argon2_cross_checked_against_cryptography():
    from cryptography.hazmat.primitives.kdf.argon2 import Argon2id

    for lanes, mem in ((1, 32), (2, 64), (4, 128)):
        ref = Argon2id(salt=b"0123456789abcdef", length=32, iterations=2,
                       lanes=lanes, memory_cost=mem).derive(b"pw")
        assert argon2kdf.argon2_key(
            b"pw", b"0123456789abcdef", 2, mem, lanes, 32,
            "argon2id") == ref


def test_argon2_reference_vectors():
    assert argon2kdf.compare(b"some-fancy-secret", ARGON2ID) is True
    assert argon2kdf.compare(b"a-blobs-tale", ARGON2ID) is False
    assert argon2kdf.compare(b"some-fancy-secret", ARGON2I) is True
    assert argon2kdf.compare(b"a-blobs-tale", ARGON2I) is False


@pytest.mark.parametrize("bad", [
    # argon2_test.go TestBloblangCompareInvalidArgon2Hashes
    "$argon2id$v=19$m=4096,t=3,p=1$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U",
    "$lol$argon2id$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U",
    "$argon2d$v=19$m=4096,t=3,p=1$c2FsdHktbWNzYWx0ZmFjZQ$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U",
    "$argon2id$v=19$m=4096,t=3,p=137174$c2FsdHktbWNzYWx0ZmFjZQ$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U",
    "$argon2id$v=19$m=4096,t=3,p=1lololol$c2FsdHktbWNzYWx0ZmFjZQ$XTu19IC4rYL/ERsDZr2HOZe9bcMx88ARJ/VVfT2Lb3U",
])
def test_argon2_invalid_hashes_error(bad):
    with pytest.raises(argon2kdf.Argon2Error):
        argon2kdf.compare(b"some-fancy-secret", bad)


def test_argon2_empty_input_is_false_without_parsing():
    # argon2.go:126-128 returns false before decoding the hash
    run = lambda src, doc: compile_mapping(src).run_value(doc, env={})
    out = run("root = this.user_input.compare_argon2(this.h)",
              {"user_input": "", "h": "not-even-a-hash"})
    assert out is False


def test_bcrypt_reference_vector_and_doc_example():
    assert bcryptkdf.compare(b"some-fancy-secret", BCRYPT) is True
    assert bcryptkdf.compare(b"a-blobs-tale", BCRYPT) is False
    doc = ("$2y$10$Dtnt5NNzVtMCOZONT705tOcS8It6krJX8bEjnDJnwxiFKsz1C.3Ay")
    assert bcryptkdf.compare(b"there-are-many-blobs-in-the-sea", doc)
    assert bcryptkdf.compare(b"will-i-ever-find-love", doc) is False


def test_bcrypt_pure_path_matches_libxcrypt():
    crypt = pytest.importorskip("crypt")
    salt22 = "ywv67wCBlpSVu.M7WrZwxu"
    want = crypt.crypt("hello-pure-path", f"$2y$05${salt22}")
    digest = bcryptkdf.bcrypt_hash(
        b"hello-pure-path", 5, bcryptkdf._b64_decode(salt22, 16))
    assert f"$2y$05${salt22}" + bcryptkdf._b64_encode(digest) == want


def test_bcrypt_pure_compare_agrees_with_fast_path():
    salt22 = "ywv67wCBlpSVu.M7WrZwxu"
    digest = bcryptkdf.bcrypt_hash(
        b"s3cret", 4, bcryptkdf._b64_decode(salt22, 16))
    h = f"$2b$04${salt22}" + bcryptkdf._b64_encode(digest)
    assert bcryptkdf._compare_pure(b"s3cret", h) is True
    assert bcryptkdf._compare_pure(b"nope", h) is False
    assert bcryptkdf.compare(b"s3cret", h) is True


@pytest.mark.parametrize("bad", [
    "", "$2y$10$tooshort", "$3a$10$" + "a" * 53, "plainstring",
])
def test_bcrypt_malformed_hashes_error(bad):
    with pytest.raises(bcryptkdf.BcryptError):
        bcryptkdf.compare(b"x", bad)


def test_bloblang_compare_methods():
    run = lambda src, doc: compile_mapping(src).run_value(doc, env={})
    out = run("root = this.user_input.compare_bcrypt(this.h)",
              {"user_input": "some-fancy-secret", "h": BCRYPT})
    assert out is True
    out = run("root = this.user_input.compare_argon2(this.h)",
              {"user_input": "wrong",
               "h": "$argon2id$v=19$m=32,t=1,p=1$c2FsdHktbWNzYWx0ZmFjZQ$"
                    + "A" * 43})
    assert out is False
