"""fastcrypto (optimization r8): the native cipher fast path must be
byte-identical to the from-scratch reference implementations on every
shape the PDF security handlers produce."""

from __future__ import annotations

import random

import pytest

from sax_wasm_spark.kernel import fastcrypto
from sax_wasm_spark.kernel.aescipher import (
    aes_cbc_decrypt as pure_cbc_dec,
    aes_cbc_encrypt as pure_cbc_enc,
    aes_encrypt_block as pure_ecb_enc,
)
from sax_wasm_spark.kernel.fastcrypto import (
    _rc4_pure,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_encrypt_block,
    rc4,
)


def test_rc4_matches_pure():
    rng = random.Random(8)
    for klen in (5, 7, 8, 10, 16, 20, 24, 32, 1, 3, 6, 13, 40):
        for dlen in (0, 1, 15, 16, 17, 256, 1000):
            key = bytes(rng.randrange(256) for _ in range(klen))
            data = bytes(rng.randrange(256) for _ in range(dlen))
            assert rc4(key, data) == _rc4_pure(key, data), (klen, dlen)
    # symmetric
    key = b"\x01\x02\x03\x04\x05"
    msg = b"attack at dawn!!"
    assert rc4(key, rc4(key, msg)) == msg


def test_aes_cbc_matches_pure():
    rng = random.Random(9)
    for klen in (16, 24, 32):
        for dlen in (0, 1, 15, 16, 17, 48, 160):
            key = bytes(rng.randrange(256) for _ in range(klen))
            iv = bytes(rng.randrange(256) for _ in range(16))
            data = bytes(rng.randrange(256) for _ in range(dlen))
            enc = aes_cbc_encrypt(key, iv, data)
            assert enc == pure_cbc_enc(key, iv, data), (klen, dlen)
            assert aes_cbc_decrypt(key, iv, enc) == data
            assert pure_cbc_dec(key, iv, enc) == data
            if dlen % 16 == 0:
                e2 = aes_cbc_encrypt(key, iv, data, pad=False)
                assert e2 == pure_cbc_enc(key, iv, data, pad=False)
                if dlen:  # empty ciphertext raises in BOTH impls
                    assert aes_cbc_decrypt(key, iv, e2, unpad=False) == data


def test_aes_block_matches_pure():
    rng = random.Random(10)
    for klen in (16, 24, 32):
        key = bytes(rng.randrange(256) for _ in range(klen))
        blk = bytes(rng.randrange(256) for _ in range(16))
        assert aes_encrypt_block(key, blk) == pure_ecb_enc(key, blk)


def test_error_contracts_match():
    key, iv = b"k" * 16, b"i" * 16
    with pytest.raises(ValueError):
        aes_cbc_encrypt(key, iv, b"x" * 17, pad=False)
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, iv, b"")
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, iv, b"x" * 15)
    # corrupt padding raises the same typed error as the reference
    good = aes_cbc_encrypt(key, iv, b"hello")
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, iv, bad)


def test_native_path_active_when_available():
    """In this sandbox cryptography IS installed; pin that the fast
    path actually engages (a silent fallback would quietly lose the
    optimization)."""
    try:
        import cryptography  # noqa: F401
    except ImportError:
        pytest.skip("cryptography absent — fallback-only environment")
    assert fastcrypto.HAVE_NATIVE
