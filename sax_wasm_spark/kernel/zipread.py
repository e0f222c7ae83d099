"""ZIP container reader — from-scratch per the public PKWARE APPNOTE
(the .ZIP File Format Specification): the archive container OOXML
(docx/xlsx), EPUB, and plain .zip crawl payloads share. Central
directory truth (the spec's rule: the CD, not local headers, is
authoritative), stored (0) and deflate (8) members via stdlib zlib,
CRC-32 verification, and hostile-input budgets.

Deliberately NOT implemented (typed errors, never wrong output):
ZIP64, encryption, spanned archives, other compression methods — the
long tail a crawl degrades to `error:*` rows.

The reference repo has no container surface (sax-wasm is an XML
tokenizer, ``/root/reference/src/sax/parser.rs:1``); this tier exists
to chain that tokenizer INTO the archive formats (q87 DOCX text, q88
EPUB chapters).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass


class ZipError(ValueError):
    """Typed failure for malformed/unsupported ZIP payloads."""


_EOCD_SIG = b"PK\x05\x06"
_CD_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"
_EOCD = struct.Struct("<4sHHHHIIH")
_CD = struct.Struct("<4sHHHHHHIIIHHHHHII")
_LOCAL = struct.Struct("<4sHHHHHIIIHH")


@dataclass
class ZipEntry:
    name: str
    method: int  # 0 stored, 8 deflate
    comp_size: int
    uncomp_size: int
    crc32: int
    local_off: int


def zip_entries(data: bytes, max_entries: int = 1 << 16) -> list[ZipEntry]:
    """Walk the central directory → entries in CD order. The EOCD is
    located by scanning back over the trailing comment (≤64 KiB per
    spec)."""
    n = len(data)
    if n < _EOCD.size:
        raise ZipError("too small for an EOCD")
    scan_from = max(0, n - _EOCD.size - 0xFFFF)
    at = data.rfind(_EOCD_SIG, scan_from)
    if at < 0:
        raise ZipError("missing end-of-central-directory")
    (_sig, _dn, _cdn, _n_here, n_total, cd_size, cd_off, _clen) = (
        _EOCD.unpack_from(data, at)
    )
    if n_total > max_entries:
        raise ZipError(f"{n_total} entries exceeds max_entries={max_entries}")
    if cd_off + cd_size > n:
        raise ZipError("central directory out of range")
    entries: list[ZipEntry] = []
    pos = cd_off
    for _ in range(n_total):
        if pos + _CD.size > n or data[pos : pos + 4] != _CD_SIG:
            raise ZipError("bad central-directory entry")
        (
            _sig, _ver_by, _ver_need, flags, method, _mt, _md,
            crc, csize, usize, nlen, elen, clen2, _disk, _iattr,
            _eattr, loff,
        ) = _CD.unpack_from(data, pos)
        if flags & 0x0001:
            raise ZipError("encrypted entry unsupported")
        if usize > 1 << 28 or csize > 1 << 28:
            raise ZipError("entry size exceeds budget")
        name = data[pos + _CD.size : pos + _CD.size + nlen].decode(
            "utf-8" if flags & 0x0800 else "cp437", errors="replace"
        )
        entries.append(ZipEntry(name, method, csize, usize, crc, loff))
        pos += _CD.size + nlen + elen + clen2
    return entries


def zip_read(data: bytes, entry: ZipEntry) -> bytes:
    """Extract one member, CRC-verified. The local header is consulted
    only for the variable-length name/extra offsets — sizes and method
    come from the central directory (spec rule + the defense against
    local/CD mismatch smuggling)."""
    off = entry.local_off
    if off + _LOCAL.size > len(data) or data[off : off + 4] != _LOCAL_SIG:
        raise ZipError(f"{entry.name}: bad local header")
    (_sig, _ver, _flags, _m, _t, _d, _crc, _cs, _us, nlen, elen) = (
        _LOCAL.unpack_from(data, off)
    )
    start = off + _LOCAL.size + nlen + elen
    blob = data[start : start + entry.comp_size]
    if len(blob) != entry.comp_size:
        raise ZipError(f"{entry.name}: member data truncated")
    if entry.method == 0:
        out = blob
    elif entry.method == 8:
        try:
            # decompressobj honors max_length (zlib.decompress's third
            # arg is only the INITIAL buffer size — a bomb would fully
            # inflate before any size check)
            d = zlib.decompressobj(-15)
            out = d.decompress(blob, entry.uncomp_size + 1)
            if len(out) > entry.uncomp_size:
                raise ZipError(f"{entry.name}: inflates past declared size")
        except zlib.error as e:
            raise ZipError(f"{entry.name}: deflate failed ({e})") from e
    else:
        raise ZipError(f"{entry.name}: compression method {entry.method}")
    if len(out) != entry.uncomp_size:
        raise ZipError(
            f"{entry.name}: size mismatch {len(out)} != {entry.uncomp_size}"
        )
    if zlib.crc32(out) & 0xFFFFFFFF != entry.crc32:
        raise ZipError(f"{entry.name}: CRC-32 mismatch")
    return out


def zip_find(data: bytes, name: str) -> bytes:
    """Read one member by exact name; ZipError when absent."""
    for e in zip_entries(data):
        if e.name == name:
            return zip_read(data, e)
    raise ZipError(f"member {name!r} not found")


def zip_write(members: list, deflate: bool = True) -> bytes:
    """Minimal writer twin: stored or deflate members + one central
    directory. Deterministic (fixed timestamps) so corpora are
    byte-stable. Members are ``(name, body)`` pairs, or
    ``(name, body, deflate_override)`` triples for per-member control
    (EPUB's ``mimetype`` must be STORED regardless of the default)."""
    out = bytearray()
    cd = bytearray()
    for member in members:
        name, body = member[0], member[1]
        use_deflate = member[2] if len(member) > 2 else deflate
        nb = name.encode("utf-8")
        crc = zlib.crc32(body) & 0xFFFFFFFF
        if use_deflate:
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            blob = comp.compress(body) + comp.flush()
            method = 8
        else:
            blob, method = body, 0
        loff = len(out)
        out += _LOCAL.pack(
            _LOCAL_SIG, 20, 0x0800, method, 0, 0x21, crc,
            len(blob), len(body), len(nb), 0,
        )
        out += nb + blob
        cd += _CD.pack(
            _CD_SIG, 20, 20, 0x0800, method, 0, 0x21, crc,
            len(blob), len(body), len(nb), 0, 0, 0, 0, 0, loff,
        )
        cd += nb
    cd_off = len(out)
    out += cd
    out += _EOCD.pack(
        _EOCD_SIG, 0, 0, len(members), len(members), len(cd), cd_off, 0
    )
    return bytes(out)
