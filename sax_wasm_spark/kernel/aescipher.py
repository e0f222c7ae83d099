"""From-scratch AES (FIPS-197) + CBC mode, pure Python stdlib.

Written for the PDF standard security handler's AES tiers
(ISO 32000-1 §7.6.2 /AESV2 = AES-128-CBC, PDF 2.0 §7.6.3.3 /AESV3 =
AES-256-CBC, and the Algorithm 2.B key-derivation loop which encrypts
with AES-128-CBC-NoPadding). No cryptography library exists in the
container and hashlib carries no block cipher, so the cipher is
implemented directly from the public FIPS-197 specification and
pinned against its Appendix B/C worked examples in
tests/test_pdf.py. Per-document payloads are small (KBs), so a pure
Python table-driven implementation is fast enough for the mapInArrow
extraction path.

Scope: ECB block primitives (encrypt + decrypt), CBC chaining with
explicit IV, PKCS#7 pad/unpad helpers. Nothing streaming, no GCM —
PDF's handler only uses CBC.
"""

from __future__ import annotations

import functools

__all__ = [
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "aes_decrypt_block",
    "aes_encrypt_block",
]

# -- S-boxes, generated from the GF(2^8) inverse + affine map so no
# 256-entry table is transcribed by hand (transcription typos are the
# classic from-scratch AES bug; generation is verified by the FIPS-197
# appendix vectors in the test suite)


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverses in GF(2^8)
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gmul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        # affine transformation: b ^ rotl(b,1..4) ^ 0x63
        s = b
        for r in (1, 2, 3, 4):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[x] = s ^ 0x63
    inv_sbox = [0] * 256
    for x, s in enumerate(sbox):
        inv_sbox[s] = x
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))

# precomputed GF multiplication tables for the (Inv)MixColumns factors
_MUL = {
    f: bytes(_gmul(x, f) for x in range(256))
    for f in (2, 3, 9, 11, 13, 14)
}


def _expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 §5.2 key expansion → list of 16-byte round keys."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = words[i - 1]
        if i % nk == 0:
            temp = bytes(
                _SBOX[b] for b in temp[1:] + temp[:1]
            )  # RotWord + SubWord
            temp = bytes([temp[0] ^ _RCON[i // nk - 1]]) + temp[1:]
        elif nk > 6 and i % nk == 4:
            temp = bytes(_SBOX[b] for b in temp)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], temp)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


# -- T-tables (the classic software-AES formulation: SubBytes +
# ShiftRows + MixColumns fused into four 256-entry 32-bit lookups per
# column). Generated, not transcribed; pinned by the FIPS-197 vectors.

_TE = []
for _coefs in ((2, 1, 1, 3), (3, 2, 1, 1), (1, 3, 2, 1), (1, 1, 3, 2)):
    _t = []
    for _x in range(256):
        _s = _SBOX[_x]
        _t.append(
            (_gmul(_s, _coefs[0]) << 24)
            | (_gmul(_s, _coefs[1]) << 16)
            | (_gmul(_s, _coefs[2]) << 8)
            | _gmul(_s, _coefs[3])
        )
    _TE.append(tuple(_t))
_TD = []
for _coefs in ((14, 9, 13, 11), (11, 14, 9, 13), (13, 11, 14, 9), (9, 13, 11, 14)):
    _t = []
    for _x in range(256):
        _s = _INV_SBOX[_x]
        _t.append(
            (_gmul(_s, _coefs[0]) << 24)
            | (_gmul(_s, _coefs[1]) << 16)
            | (_gmul(_s, _coefs[2]) << 8)
            | _gmul(_s, _coefs[3])
        )
    _TD.append(tuple(_t))
del _t, _x, _s, _coefs


def _key_words(rk: list[bytes]) -> list[tuple[int, int, int, int]]:
    return [
        tuple(int.from_bytes(k[4 * c : 4 * c + 4], "big") for c in range(4))
        for k in rk
    ]


@functools.lru_cache(maxsize=64)
def _enc_schedule(key: bytes) -> list[tuple[int, int, int, int]]:
    return _key_words(_expand_key(key))


@functools.lru_cache(maxsize=64)
def _dec_schedule(key: bytes) -> list:
    """Preprocessed decrypt schedule: word keys with the middle rounds
    already InvMixColumns-transformed. lru_cached by key (round-6
    review): a V5 document decrypts every string and stream under the
    ONE file key, so per-call schedule builds were pure waste on the
    mapInArrow hot path."""
    rk = _key_words(_expand_key(key))
    mid = [tuple(_inv_mix_word(w) for w in kw) for kw in rk[1:-1]]
    return [rk[0], *mid, rk[-1]]


def _inv_mix_word(w: int) -> int:
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    b0, b1, b2, b3 = w >> 24, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF
    return (
        ((m14[b0] ^ m11[b1] ^ m13[b2] ^ m9[b3]) << 24)
        | ((m9[b0] ^ m14[b1] ^ m11[b2] ^ m13[b3]) << 16)
        | ((m13[b0] ^ m9[b1] ^ m14[b2] ^ m11[b3]) << 8)
        | (m11[b0] ^ m13[b1] ^ m9[b2] ^ m14[b3])
    )


def aes_encrypt_block(key: bytes, block: bytes, _rk=None) -> bytes:
    rk = _rk if _rk is not None else _enc_schedule(key)
    t0, t1, t2, t3 = _TE
    k = rk[0]
    w0 = int.from_bytes(block[0:4], "big") ^ k[0]
    w1 = int.from_bytes(block[4:8], "big") ^ k[1]
    w2 = int.from_bytes(block[8:12], "big") ^ k[2]
    w3 = int.from_bytes(block[12:16], "big") ^ k[3]
    for k in rk[1:-1]:
        n0 = t0[w0 >> 24] ^ t1[(w1 >> 16) & 0xFF] ^ t2[(w2 >> 8) & 0xFF] ^ t3[w3 & 0xFF] ^ k[0]
        n1 = t0[w1 >> 24] ^ t1[(w2 >> 16) & 0xFF] ^ t2[(w3 >> 8) & 0xFF] ^ t3[w0 & 0xFF] ^ k[1]
        n2 = t0[w2 >> 24] ^ t1[(w3 >> 16) & 0xFF] ^ t2[(w0 >> 8) & 0xFF] ^ t3[w1 & 0xFF] ^ k[2]
        n3 = t0[w3 >> 24] ^ t1[(w0 >> 16) & 0xFF] ^ t2[(w1 >> 8) & 0xFF] ^ t3[w2 & 0xFF] ^ k[3]
        w0, w1, w2, w3 = n0, n1, n2, n3
    sb = _SBOX
    k = rk[-1]
    o0 = ((sb[w0 >> 24] << 24) | (sb[(w1 >> 16) & 0xFF] << 16) | (sb[(w2 >> 8) & 0xFF] << 8) | sb[w3 & 0xFF]) ^ k[0]
    o1 = ((sb[w1 >> 24] << 24) | (sb[(w2 >> 16) & 0xFF] << 16) | (sb[(w3 >> 8) & 0xFF] << 8) | sb[w0 & 0xFF]) ^ k[1]
    o2 = ((sb[w2 >> 24] << 24) | (sb[(w3 >> 16) & 0xFF] << 16) | (sb[(w0 >> 8) & 0xFF] << 8) | sb[w1 & 0xFF]) ^ k[2]
    o3 = ((sb[w3 >> 24] << 24) | (sb[(w0 >> 16) & 0xFF] << 16) | (sb[(w1 >> 8) & 0xFF] << 8) | sb[w2 & 0xFF]) ^ k[3]
    return b"".join(o.to_bytes(4, "big") for o in (o0, o1, o2, o3))


def aes_decrypt_block(key: bytes, block: bytes, _rk=None) -> bytes:
    # equivalent inverse cipher: Td tables + InvMixColumns-transformed
    # middle round keys (preprocessed once per key in _dec_schedule),
    # consumed in reverse order
    rk = _rk if _rk is not None else _dec_schedule(key)
    d0, d1, d2, d3 = _TD
    k = rk[-1]
    w0 = int.from_bytes(block[0:4], "big") ^ k[0]
    w1 = int.from_bytes(block[4:8], "big") ^ k[1]
    w2 = int.from_bytes(block[8:12], "big") ^ k[2]
    w3 = int.from_bytes(block[12:16], "big") ^ k[3]
    for k in rk[-2:0:-1]:
        n0 = d0[w0 >> 24] ^ d1[(w3 >> 16) & 0xFF] ^ d2[(w2 >> 8) & 0xFF] ^ d3[w1 & 0xFF] ^ k[0]
        n1 = d0[w1 >> 24] ^ d1[(w0 >> 16) & 0xFF] ^ d2[(w3 >> 8) & 0xFF] ^ d3[w2 & 0xFF] ^ k[1]
        n2 = d0[w2 >> 24] ^ d1[(w1 >> 16) & 0xFF] ^ d2[(w0 >> 8) & 0xFF] ^ d3[w3 & 0xFF] ^ k[2]
        n3 = d0[w3 >> 24] ^ d1[(w2 >> 16) & 0xFF] ^ d2[(w1 >> 8) & 0xFF] ^ d3[w0 & 0xFF] ^ k[3]
        w0, w1, w2, w3 = n0, n1, n2, n3
    ib = _INV_SBOX
    k = rk[0]
    o0 = ((ib[w0 >> 24] << 24) | (ib[(w3 >> 16) & 0xFF] << 16) | (ib[(w2 >> 8) & 0xFF] << 8) | ib[w1 & 0xFF]) ^ k[0]
    o1 = ((ib[w1 >> 24] << 24) | (ib[(w0 >> 16) & 0xFF] << 16) | (ib[(w3 >> 8) & 0xFF] << 8) | ib[w2 & 0xFF]) ^ k[1]
    o2 = ((ib[w2 >> 24] << 24) | (ib[(w1 >> 16) & 0xFF] << 16) | (ib[(w0 >> 8) & 0xFF] << 8) | ib[w3 & 0xFF]) ^ k[2]
    o3 = ((ib[w3 >> 24] << 24) | (ib[(w2 >> 16) & 0xFF] << 16) | (ib[(w1 >> 8) & 0xFF] << 8) | ib[w0 & 0xFF]) ^ k[3]
    return b"".join(o.to_bytes(4, "big") for o in (o0, o1, o2, o3))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """CBC encrypt; PKCS#7 padding by default (pad=False requires a
    16-multiple — the §7.6.3.3 Algorithm 2.B KDF uses NoPadding)."""
    if pad:
        n = 16 - (len(data) % 16)
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("NoPadding CBC needs a 16-byte multiple")
    rk = _enc_schedule(key)
    # fully inlined word-state loop: Hash-2B pushes tens of thousands
    # of blocks through here, so per-block byte<->int conversions and
    # function calls are the budget. State stays as four 32-bit words;
    # bytes materialize once at the end.
    t0, t1, t2, t3 = _TE
    sb = _SBOX
    k0 = rk[0]
    klast = rk[-1]
    kmid = rk[1:-1]
    p0, p1, p2, p3 = (int.from_bytes(iv[j : j + 4], "big") for j in (0, 4, 8, 12))
    out = bytearray(len(data))
    mv = memoryview(out)
    for i in range(0, len(data), 16):
        w0 = int.from_bytes(data[i : i + 4], "big") ^ p0 ^ k0[0]
        w1 = int.from_bytes(data[i + 4 : i + 8], "big") ^ p1 ^ k0[1]
        w2 = int.from_bytes(data[i + 8 : i + 12], "big") ^ p2 ^ k0[2]
        w3 = int.from_bytes(data[i + 12 : i + 16], "big") ^ p3 ^ k0[3]
        for k in kmid:
            n0 = t0[w0 >> 24] ^ t1[(w1 >> 16) & 0xFF] ^ t2[(w2 >> 8) & 0xFF] ^ t3[w3 & 0xFF] ^ k[0]
            n1 = t0[w1 >> 24] ^ t1[(w2 >> 16) & 0xFF] ^ t2[(w3 >> 8) & 0xFF] ^ t3[w0 & 0xFF] ^ k[1]
            n2 = t0[w2 >> 24] ^ t1[(w3 >> 16) & 0xFF] ^ t2[(w0 >> 8) & 0xFF] ^ t3[w1 & 0xFF] ^ k[2]
            n3 = t0[w3 >> 24] ^ t1[(w0 >> 16) & 0xFF] ^ t2[(w1 >> 8) & 0xFF] ^ t3[w2 & 0xFF] ^ k[3]
            w0, w1, w2, w3 = n0, n1, n2, n3
        p0 = ((sb[w0 >> 24] << 24) | (sb[(w1 >> 16) & 0xFF] << 16) | (sb[(w2 >> 8) & 0xFF] << 8) | sb[w3 & 0xFF]) ^ klast[0]
        p1 = ((sb[w1 >> 24] << 24) | (sb[(w2 >> 16) & 0xFF] << 16) | (sb[(w3 >> 8) & 0xFF] << 8) | sb[w0 & 0xFF]) ^ klast[1]
        p2 = ((sb[w2 >> 24] << 24) | (sb[(w3 >> 16) & 0xFF] << 16) | (sb[(w0 >> 8) & 0xFF] << 8) | sb[w1 & 0xFF]) ^ klast[2]
        p3 = ((sb[w3 >> 24] << 24) | (sb[(w0 >> 16) & 0xFF] << 16) | (sb[(w1 >> 8) & 0xFF] << 8) | sb[w2 & 0xFF]) ^ klast[3]
        mv[i : i + 4] = p0.to_bytes(4, "big")
        mv[i + 4 : i + 8] = p1.to_bytes(4, "big")
        mv[i + 8 : i + 12] = p2.to_bytes(4, "big")
        mv[i + 12 : i + 16] = p3.to_bytes(4, "big")
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """CBC decrypt; strips PKCS#7 padding by default. A lenient-but-
    checked unpad: an invalid final-byte count raises ValueError (the
    PDF layer maps that to a per-row error status)."""
    if len(data) % 16 or not data:
        raise ValueError("CBC ciphertext must be a nonzero 16-byte multiple")
    rk = _dec_schedule(key)
    out = bytearray()
    prev = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        cur = int.from_bytes(blk, "big")
        dec = aes_decrypt_block(key, blk, _rk=rk)
        out += (int.from_bytes(dec, "big") ^ prev).to_bytes(16, "big")
        prev = cur
    if unpad:
        n = out[-1]
        if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
            raise ValueError("bad CBC padding")
        del out[-n:]
    return bytes(out)
