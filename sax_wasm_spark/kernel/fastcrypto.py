"""Crypto fast path for the PDF §7.6 security handlers (optimization r8).

The from-scratch primitives stay the reference implementations —
:mod:`aescipher` (FIPS-197, pinned to the spec's appendix vectors) and
the pure-Python RC4 in :mod:`pdftext` / :mod:`..sources.pdfgen` — but
the per-object cipher work dominated pdf_extract_roundtrip's per-doc
CPU (guide §4.2: hand the inner loop to native code). When the
``cryptography`` package (OpenSSL-backed, a standard public library) is
importable, these wrappers run the SAME algorithms natively; when it is
not, they fall back to the from-scratch code, so behavior is identical
everywhere and the fallback stays test-covered
(tests/test_fastcrypto.py proves native == from-scratch on random
vectors whenever the native path exists).

RC4 keys outside OpenSSL's supported sizes (5/7/8/10/16/20/24/32
bytes) route to the pure implementation — PDF's standard handler only
produces 5/10/16-byte keys, so the native path covers the corpus.
"""

from __future__ import annotations

from .aescipher import aes_cbc_encrypt as _aes_cbc_encrypt_pure

_ARC4_KEY_SIZES = frozenset((5, 7, 8, 10, 16, 20, 24, 32))

try:  # pragma: no cover - exercised when cryptography is installed
    from cryptography.hazmat.primitives.ciphers import (  # type: ignore
        Cipher,
        algorithms,
        modes,
    )

    try:
        from cryptography.hazmat.decrepit.ciphers.algorithms import (  # type: ignore
            ARC4 as _ARC4,
        )
    except ImportError:  # older cryptography keeps ARC4 in algorithms
        _ARC4 = getattr(algorithms, "ARC4", None)

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover
    Cipher = algorithms = modes = _ARC4 = None
    HAVE_NATIVE = False


def _rc4_pure(key: bytes, data: bytes) -> bytes:
    """The published RC4 algorithm — reference + fallback path."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric): native when available and the key size is one
    OpenSSL accepts, else the pure fallback."""
    if _ARC4 is not None and len(key) in _ARC4_KEY_SIZES:
        enc = Cipher(_ARC4(key), mode=None).encryptor()
        return enc.update(data) + enc.finalize()
    return _rc4_pure(key, data)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """AES-CBC encrypt, PKCS#7 by default — same contract as
    :func:`aescipher.aes_cbc_encrypt`."""
    if not HAVE_NATIVE:
        return _aes_cbc_encrypt_pure(key, iv, data, pad=pad)
    if pad:
        n = 16 - (len(data) % 16)
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("NoPadding CBC needs a 16-byte multiple")
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def aes_encrypt_block(key: bytes, block: bytes, _rk=None) -> bytes:
    """Single-block AES encrypt (ECB primitive) — same contract as
    :func:`aescipher.aes_encrypt_block`."""
    if not HAVE_NATIVE:
        from .aescipher import aes_encrypt_block as _pure  # noqa: PLC0415

        return _pure(key, block, _rk=_rk)
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(block) + enc.finalize()


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt with the same lenient-but-checked unpad contract
    as :func:`aescipher.aes_cbc_decrypt` (identical error messages)."""
    if len(data) % 16 or not data:
        raise ValueError("CBC ciphertext must be a nonzero 16-byte multiple")
    if not HAVE_NATIVE:
        from .aescipher import aes_cbc_decrypt as _pure  # noqa: PLC0415

        return _pure(key, iv, data, unpad=unpad)
    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    out = dec.update(data) + dec.finalize()
    if unpad:
        n = out[-1]
        if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
            raise ValueError("bad CBC padding")
        out = out[:-n]
    return bytes(out)
